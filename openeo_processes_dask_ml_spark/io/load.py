"""Sources and sinks.

``load_collection`` in the reference maps a collection id to a STAC
catalog scan with pushed-down property filters and a fixed chunking
(reference: minibackend/custom_processes.py:55-112). Here a collection
id maps to a parquet table plus a cube-layout spec; property filters
become ordinary ``filter`` calls that Catalyst pushes into the parquet
scan (check `.explain`: PushedFilters). ``save_result`` maps the
format dispatch at custom_processes.py:191-219 onto DataFrame writers.
"""

from __future__ import annotations

from contextlib import contextmanager
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from openeo_processes_dask_ml_spark.cube import CubeFrame
from openeo_processes_dask_ml_spark.scale.tuning import local_rows_df


# Columns stored as parquet TIMESTAMP(NANOS), which Spark's vectorized
# reader rejects; read nanos as long and truncate to micros (exactly
# what DuckDB's TIMESTAMP_NS -> TIMESTAMP cast does).
_NANOS_TS_COLS: dict[str, tuple[str, ...]] = {
    "events": ("ts",),
    "orders": ("o_orderdate",),
    "lineitem": ("l_shipdate",),
}


# The engine's session contract (ONE source of truth — VERDICT r7 #3:
# seven query bodies used to repeat these as inline conf.set triples,
# which is the drift-prone shape this dict replaces):
# - nanosAsLong: fixture columns stored as parquet TIMESTAMP(NANOS),
#   which Spark's vectorized reader rejects; read nanos as long and
#   truncate to micros (exactly DuckDB's TIMESTAMP_NS -> TIMESTAMP).
# - inferTimestampNTZ off: testdata timestamps are parquet
#   timestamp[us] without a timezone, which Spark 4 would otherwise
#   surface as TIMESTAMP_NTZ — a type unix_timestamp/unix_micros
#   reject and DuckDB's naive TIMESTAMP doesn't hash-match.
# - session timeZone UTC: the LTZ interpretation of those naive
#   instants must not float with the host timezone (ADVICE r4), and
#   collect()-time rendering of LTZ timestamps uses the CURRENT
#   session tz — which is why the query surface pins and does NOT
#   restore: a restore to a non-UTC ambient zone would shift
#   timestamps collected after the query function returns.
_PINNED_SESSION_CONFS: dict[str, str] = {
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.parquet.inferTimestampNTZ.enabled": "false",
    "spark.sql.session.timeZone": "UTC",
}


def _ensure_session_confs(spark: SparkSession) -> None:
    """Reader confs the fixture data requires, re-asserted on EVERY
    load: memoizing them (tried, reverted) lets an application that
    flips spark.sql.session.timeZone between loads silently read the
    timezone-less fixture timestamps under the wrong zone — the runtime
    conf.set is a local map write, so re-asserting costs nothing.

    This is the idempotent fixed point every query body converges to:
    running any engine query leaves the session exactly in this state,
    so no query can inherit a DIFFERENT state from its predecessor
    (the conf-leak failure class). Applications that need their own
    timezone afterwards should use :func:`session_confs_pinned`."""
    for k, v in _PINNED_SESSION_CONFS.items():
        spark.conf.set(k, v)


# public name: query bodies and streaming runners call this instead of
# repeating inline conf.set triples
pin_session_confs = _ensure_session_confs


@contextmanager
def session_confs_pinned(spark: SparkSession):
    """Scoped variant: pin the engine's session confs, restore the
    caller's previous values (or unset) on exit. For applications that
    interleave engine queries with their own session-tz-sensitive work.
    NOTE the restore means LTZ timestamp results collected AFTER the
    block render under the restored zone — collect inside the block."""
    saved: dict[str, str | None] = {}
    for k in _PINNED_SESSION_CONFS:
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
    pin_session_confs(spark)
    try:
        yield spark
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    _ensure_session_confs(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    dtypes = dict(df.dtypes)
    for c in _NANOS_TS_COLS.get(name, ()):
        if dtypes.get(c) == "bigint":
            # integer div — double division on int64 nanos loses
            # precision past 2^53 and shifts timestamps by 1 us
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"{c} div 1000")))
    return df


def load_source(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: str | None = None,
    **options,
) -> DataFrame:
    """Format-dispatched source reader: parquet (the scale default),
    csv, json(lines), orc, text.

    Scale rules enforced here rather than left to callers:
    - csv/json REQUIRE an explicit schema: ``inferSchema``/sampled
      inference is a full extra pass over the data (at 100 TB, a
      100 TB pass) and its result can drift between runs — a schema
      string costs one line and keeps the plan deterministic. Column
      pruning still reaches the reader; note that csv/json row formats
      cannot skip column BYTES on disk the way parquet does, so
      convert-to-parquet is step one of any real pipeline
      (``save_result(..., format='parquet')``).
    - mode defaults to FAILFAST: silently null-ing malformed rows
      (PERMISSIVE) turns data corruption into wrong answers downstream;
      opt into PERMISSIVE explicitly with a corrupt-record column if
      quarantining is wanted.
    """
    fmt = fmt.lower()
    if fmt in ("parquet", "orc", "text") and schema is not None:
        # consistency with the strict csv/json posture (ADVICE r6):
        # parquet/orc carry their own schema and text is fixed
        # (value string) — silently ignoring a passed schema would hide
        # a caller's wrong expectation instead of surfacing it
        raise ValueError(
            f"{fmt} sources do not take a schema (parquet/orc are "
            "self-describing; text is always `value string`) — drop the "
            "schema argument or cast/select after the read"
        )
    if fmt == "parquet":
        return spark.read.options(**options).parquet(path)
    if fmt == "orc":
        return spark.read.options(**options).orc(path)
    if fmt in ("csv", "json"):
        if schema is None:
            raise ValueError(
                f"{fmt} sources require an explicit schema: inference is "
                "an extra full pass over the data and non-deterministic "
                "across runs (pass schema='col TYPE, ...')"
            )
        options.setdefault("mode", "FAILFAST")
        if fmt == "csv":
            options.setdefault("header", "true")
            return spark.read.schema(schema).options(**options).csv(path)
        return spark.read.schema(schema).options(**options).json(path)
    if fmt == "text":
        return spark.read.options(**options).text(path)
    raise ValueError(f"unsupported source format: {fmt!r}")


def load_source_quarantine(
    spark: SparkSession,
    path: str,
    fmt: str,
    schema: str,
    corrupt_col: str = "_corrupt_record",
    **options,
) -> tuple[DataFrame, DataFrame]:
    """The crawl-ingest counterpart to ``load_source``'s FAILFAST
    default: a PERMISSIVE read that SPLITS instead of silently
    null-ing — returns ``(good, quarantined)`` where ``good`` carries
    exactly ``schema`` (parse failures removed) and ``quarantined``
    carries every malformed row with its raw text in ``corrupt_col``
    for audit/replay. At 100 TB some records are always broken; the
    choice this function forces is explicit quarantine, never
    corruption-as-nulls flowing into dedup/training downstream.

    csv/json only — self-describing formats fail at the footer, not
    per row. Both returned frames are lazy projections over one text
    scan at action time, with the parse as a
    ``from_json``/``from_csv`` EXPRESSION. Exception (csv with
    ``header=true`` only): identifying each file's header line costs
    ONE additional eager pass over the text at CALL time — the
    per-file first-line positions are collected (file-count-bounded),
    shape-checked, and frozen into a literal broadcast table so the
    action-time plan never re-aggregates the corpus (ADVICE r9). A
    real pipeline pays that pass once, in the convert-to-parquet
    step. The parse is an expression rather than a schema'd csv/json
    scan, whose internal corrupt column Spark refuses to query on its
    own (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN), so e.g.
    ``quarantined.count()`` would throw. Expression-side parsing has
    no such restriction, and a row format reads full lines either way
    so no pruning is lost. Write the quarantine side somewhere durable
    before dropping it.
    """
    from pyspark.sql.types import StructType

    fmt = fmt.lower()
    if fmt not in ("csv", "json"):
        raise ValueError(
            "quarantine reads apply to row formats (csv/json); "
            f"got {fmt!r}"
        )
    parse_opts = {
        k: str(v) for k, v in options.items() if k not in ("header",)
    }
    parse_opts["mode"] = "PERMISSIVE"
    parse_opts["columnNameOfCorruptRecord"] = corrupt_col
    full_schema = f"{schema}, `{corrupt_col}` string"
    raw = spark.read.text(path)
    if fmt == "csv":
        header = str(options.get("header", "true")).lower() == "true"
        if header:
            # drop the FIRST LINE of each file (ADVICE r7: the former
            # byte-equal-to-joined-schema filter leaked foreign headers
            # whose spelling differed from the declared schema — with
            # an all-string schema they then parse as good rows — and
            # silently dropped any legitimate data row equal to the
            # header string). Per-file first line = the minimum
            # monotonically_increasing_id per input file: splits of one
            # file stay in offset order in Spark's file bin-packing, so
            # ids within a file increase with byte offset. The per-file
            # min agg map-side-combines to n_files rows and broadcasts
            # back; the price is a second pass over the text — which a
            # real pipeline pays once, in the convert-to-parquet step.
            # Version pin for the ordering assumption (ADVICE r8): ids
            # within a file increase with byte offset because Spark's
            # FilePartition bin-packing (4.x, FilePartition#getFilePartitions)
            # keeps a file's splits in offset order; the header-shape
            # check below is the tripwire if that ever changes.
            tagged = raw.select(
                F.col("value"),
                F.input_file_name().alias("__file"),
                F.monotonically_increasing_id().alias("__pos"),
            )
            firsts = tagged.groupBy("__file").agg(
                F.min("__pos").alias("__first"),
                F.min_by("value", "__pos").alias("__line"),
            )
            # ONE eager pass computes the per-file first lines (ADVICE
            # r9: collect once, then rebuild the join side as a LITERAL
            # local relation from the collected rows — the former code
            # collected firsts AND re-aggregated the full corpus a
            # second time inside the broadcast join). The collected
            # set is file-count-bounded (n_files rows), never
            # line-count-bounded. The dropped lines are verified to
            # actually LOOK like a header (first token == first
            # declared field): a mismatch means either a headerless
            # file (its first DATA row is being dropped) or a
            # split-ordering change — both deserve a loud warning.
            import warnings as _warnings

            first_field = (
                schema.split(",")[0].strip().split()[0].strip("` ").lower()
            )
            sep = str(options.get("sep", ","))
            first_rows = firsts.collect()
            for r in first_rows:
                token = (r["__line"] or "").split(sep)[0].strip().strip('"')
                if token.lower() != first_field:
                    _warnings.warn(
                        f"read_with_quarantine: dropped first line of "
                        f"{r['__file']} does not look like a header "
                        f"(got {token!r}, expected {first_field!r}) — "
                        "headerless file or split-order change; pass "
                        "header='false' if the file has no header",
                        UserWarning,
                        stacklevel=2,
                    )
            firsts_local = local_rows_df(
                spark,
                [(r["__file"], r["__first"]) for r in first_rows],
                "__file string, __first long",
            )
            raw = (
                tagged.join(F.broadcast(firsts_local), "__file")
                .filter(F.col("__pos") != F.col("__first"))
                .select("value")
            )
        parsed = raw.select(
            F.from_csv(F.col("value"), full_schema, parse_opts).alias("r"),
            F.col("value"),
        )
    else:
        parsed = raw.select(
            F.from_json(F.col("value"), full_schema, parse_opts).alias("r"),
            F.col("value"),
        )
    data_fields = [f.name for f in StructType.fromDDL(schema).fields]
    # from_json yields a NULL struct for lines that are not even
    # parseable as JSON (instead of populating the corrupt field the
    # way the mismatched-type case does) — both are quarantine
    corrupt = F.col("r").isNull() | F.col(f"r.{corrupt_col}").isNotNull()
    good = parsed.filter(~corrupt).select(
        *[F.col(f"r.{c}").alias(c) for c in data_fields]
    )
    bad = parsed.filter(corrupt).select(
        F.col("value").alias(corrupt_col),
        *[F.col(f"r.{c}").alias(c) for c in data_fields],
    )
    return good, bad


@dataclass(frozen=True)
class CollectionSpec:
    """How a flat table presents as a datacube.

    ``derive`` adds computed columns (name, SQL expr) after the scan —
    pure projections, fused into the read by whole-stage codegen, so a
    derived-grid collection costs nothing extra at 100 TB.

    ``catalog`` marks a provider-flavored collection
    ("<backend>/<collection>", e.g. "cdse/sentinel-2-l2a"): its band
    labels are provider asset names and are canonicalized on load
    through ``BAND_CONVERSIONS`` so the alias resolver sees common
    names (reference get_datacube.py:190-234).
    """

    table: str
    dims: dict[str, str]  # logical dim -> column
    value_col: str
    derive: tuple = ()  # ((column, sql_expr), ...)
    catalog: str | None = None


# --- STAC catalog routing + provider band tables (SURVEY §2.6) -----------
#
# The reference routes "<backend>/<collection>" ids to one of three
# public STAC catalogs (minibackend/custom_processes.py:63-94) and
# rewrites canonical band names to each provider's asset names before
# loading, renaming back afterwards (opd_ml_dev_utils/
# get_datacube.py:190-234). The routing and rename maps are pure data —
# reproduced here offline; actual catalog HTTP access is out of scope
# in this environment (no network), so routing resolves ids and band
# names but a routed load raises with the resolved URL.

DATA_BACKENDS: dict[str, str] = {
    "aws": "https://earth-search.aws.element84.com/v1",
    "cdse": "https://stac.dataspace.copernicus.eu/v1",
    "planetarycomputer": "https://planetarycomputer.microsoft.com/api/stac/v1",
}

# (backend, collection) -> {canonical common name: provider asset name};
# "*" matches every collection of that backend.
BAND_CONVERSIONS: dict[tuple[str, str], dict[str, str]] = {
    ("cdse", "sentinel-2-l2a"): {
        "coastal": "B01_20m",
        "blue": "B02_10m",
        "green": "B03_10m",
        "red": "B04_10m",
        "rededge1": "B05_20m",
        "rededge2": "B06_20m",
        "rededge3": "B07_20m",
        "nir": "B08_10m",
        "nir08": "B8A_20m",
        "nir09": "B09_60m",
        "swir16": "B11_20m",
        "swir22": "B12_20m",
    },
    ("cdse", "sentinel-2-global-mosaics"): {
        "blue": "B02",
        "green": "B03",
        "red": "B04",
        "nir": "B08",
    },
    ("planetarycomputer", "*"): {
        "coastal": "B01",
        "blue": "B02",
        "green": "B03",
        "red": "B04",
        "rededge1": "B05",
        "rededge2": "B06",
        "rededge3": "B07",
        "nir": "B08",
        "nir08": "B8A",
        "nir09": "B09",
        "swir16": "B11",
        "swir22": "B12",
        "scl": "SCL",
    },
}


def parse_collection_id(collection_id: str) -> tuple[str, str]:
    """Split "<backend>/<collection>" (bare ids default to
    planetarycomputer, reference custom_processes.py:69-86)."""
    parts = collection_id.split("/")
    if len(parts) == 1:
        return "planetarycomputer", collection_id
    if len(parts) == 2:
        backend, coll = parts
        if backend not in DATA_BACKENDS:
            raise ValueError(
                f"data backend {backend!r} not available; use one of "
                f"{', '.join(sorted(DATA_BACKENDS))}"
            )
        return backend, coll
    raise ValueError(
        "could not parse collection id: must be a collection name or "
        "<backend>/<collection-name>"
    )


def band_conversion_for(backend: str, collection: str) -> dict[str, str]:
    """The canonical->provider band map for a routed collection
    (empty when the provider uses canonical names already)."""
    return BAND_CONVERSIONS.get(
        (backend, collection), BAND_CONVERSIONS.get((backend, "*"), {})
    )


def to_provider_bands(catalog: str, bands: list[str]) -> list[str]:
    """Rewrite requested band names to provider asset names, exactly the
    reference's pre-load conversion (get_datacube.py:190-234): each
    request canonicalizes through the alias groups, then maps through
    the provider table; unknown names pass through untouched."""
    from openeo_processes_dask_ml_spark.utils.dim_utils import canonical_band

    backend, coll = parse_collection_id(catalog)
    conv = band_conversion_for(backend, coll)
    canon_conv = {canonical_band(k): v for k, v in conv.items()}
    return [canon_conv.get(canonical_band(b), b) for b in bands]


def canonicalize_band_labels(cube: CubeFrame, catalog: str) -> CubeFrame:
    """Rename provider asset band labels back to canonical common names
    (the reference's post-load old_bands rename) — a when-chain
    projection over the bands column, free under codegen."""
    backend, coll = parse_collection_id(catalog)
    conv = band_conversion_for(backend, coll)
    if not conv:
        return cube
    return cube.rename_labels(
        "bands", target=list(conv.keys()), source=list(conv.values())
    )


# The driver's synthetic tables in cube roles (see FIXTURES.md F7):
# events: time=ts, bands=event_type, geometry cell=user_id, value=value.
# lineitem: time=l_shipdate, bands=l_returnflag, cell=l_suppkey.
COLLECTIONS: dict[str, CollectionSpec] = {
    "events": CollectionSpec(
        "events", {"time": "ts", "bands": "event_type", "geometry": "user_id"}, "value"
    ),
    "lineitem": CollectionSpec(
        "lineitem",
        {"time": "l_shipdate", "bands": "l_returnflag", "geometry": "l_suppkey"},
        "l_extendedprice",
    ),
    # events presented as a 16x16 raster (x = user_id mod 16,
    # y = user_id div 16 mod 16) so graph pipelines can exercise the
    # spatial processes (aggregate_spatial, mask_polygon) end-to-end.
    "events_grid": CollectionSpec(
        "events",
        {"x": "x", "y": "y", "time": "ts", "bands": "event_type"},
        "value",
        derive=(
            ("x", "CAST(user_id % 16 AS DOUBLE)"),
            ("y", "CAST((user_id DIV 16) % 16 AS DOUBLE)"),
        ),
    ),
    # events presented as a CDSE-flavored Sentinel-2 cube: band labels
    # are provider asset names (B04_10m...) which load_collection
    # canonicalizes back to common names (red/nir/...) through
    # BAND_CONVERSIONS — the fixture exercising the provider-rename
    # path end-to-end without network.
    "events_s2_cdse": CollectionSpec(
        "events",
        {"time": "ts", "bands": "band", "geometry": "user_id"},
        "value",
        derive=(
            (
                "band",
                "CASE event_type WHEN 'click' THEN 'B04_10m' "
                "WHEN 'view' THEN 'B08_10m' WHEN 'purchase' THEN 'B03_10m' "
                "WHEN 'signup' THEN 'B02_10m' ELSE 'B11_20m' END",
            ),
        ),
        catalog="cdse/sentinel-2-l2a",
    ),
}

_FILTER_OPS = {
    "lt": lambda c, v: c < v,
    "lte": lambda c, v: c <= v,
    "gt": lambda c, v: c > v,
    "gte": lambda c, v: c >= v,
    "eq": lambda c, v: c == v,
    "neq": lambda c, v: c != v,
}


def load_collection(
    spark: SparkSession,
    collection_id: str,
    sf_dir: str,
    spatial_extent: dict | None = None,
    temporal_extent: tuple | list | None = None,
    bands: list[str] | None = None,
    properties: dict[str, dict] | None = None,
) -> CubeFrame:
    """Collection scan with pushed-down extent/band/property filters.

    ``properties`` follows the reference's reduced form
    {column: {op: value}} (custom_processes.py:32-51) — each entry
    becomes a WHERE predicate Catalyst pushes to the parquet reader.
    """
    spec = COLLECTIONS.get(collection_id)
    if spec is None:
        # routed ids resolve to a public STAC catalog (reference
        # custom_processes.py:63-94); catalog HTTP access needs network,
        # absent here — fail with the resolved route, not a blind KeyError
        # bare names are local collections (ValueError below); only an
        # explicit "<backend>/<collection>" id engages catalog routing
        backend = None
        if "/" in collection_id:
            try:
                backend, coll = parse_collection_id(collection_id)
            except ValueError:
                backend = None
        if backend is not None:
            raise NotImplementedError(
                f"collection {collection_id!r} routes to STAC catalog "
                f"{DATA_BACKENDS[backend]}/collections/{coll}; use "
                "io.stac_client.stac_asset_table for the catalog search "
                "(network or injected transport required) — pixel decode "
                "additionally needs the geo stack. Local collections: "
                f"{sorted(COLLECTIONS)}"
            )
        raise ValueError(
            f"unknown collection {collection_id!r}; known: {sorted(COLLECTIONS)}"
        )
    df = load_table(spark, sf_dir, spec.table)
    for col, expr in spec.derive:
        df = df.withColumn(col, F.expr(expr))
    cube = CubeFrame(df, dict(spec.dims), spec.value_col)
    if spec.catalog:
        cube = canonicalize_band_labels(cube, spec.catalog)
    if temporal_extent is not None:
        cube = cube.filter_temporal(temporal_extent[0], temporal_extent[1])
    if bands is not None:
        cube = cube.filter_labels("bands", bands)
    if properties:
        for column, cond in properties.items():
            for op, value in cond.items():
                cube = cube.with_df(
                    cube.df.filter(_FILTER_OPS[op](F.col(column), F.lit(value)))
                )
    return cube


RASTER_FORMATS = ("netcdf", "gtiff", "zarr")


def _gtiff_slice_name(ts, unique_id: str) -> str:
    """Per-timestep member filename inside the multi-time GTiff zip
    (reference custom_processes.py:164-170 naming)."""
    import pandas as pd

    stamp = pd.Timestamp(ts).strftime("%Y-%m-%dT%H-%M-%SZ")
    return f"openeo_output__{stamp}_{unique_id}.tif"


def _nonnan_time_slices(pdf, time_col: str, value_col: str) -> list:
    """Sorted timesteps whose slice holds at least one non-NaN value —
    all-NaN slices are skipped, reference custom_processes.py:172-173."""
    import numpy as np

    keep = []
    for ts, grp in pdf.groupby(time_col, sort=True):
        vals = grp[value_col].to_numpy(dtype=float, na_value=np.nan)
        if not np.isnan(vals).all():
            keep.append(ts)
    return keep


def _export_gtiff(ds, pdf, path: str, value_col: str, dims: list[str]) -> str:
    """GTiff export with reference parity (custom_processes.py:121-184):
    single timestep -> one COG; multiple timesteps -> one .tif per
    non-all-NaN timestep, zipped (path gains .zip), temp files removed.
    Caller guarantees rioxarray is importable."""
    import os
    import uuid
    import zipfile

    time_col = next((d for d in dims if d.lower() in ("time", "t", "date")), None)
    times = (
        _nonnan_time_slices(pdf, time_col, value_col) if time_col else []
    )
    if time_col is None or len(pdf[time_col].unique()) <= 1:
        da = ds[value_col]
        if time_col is not None:
            da = da.isel({time_col: 0})
        da.rio.to_raster(path, driver="COG", reading_driver="COG")
        return path
    zip_path = path.replace(".gtiff", ".zip")
    if not zip_path.endswith(".zip"):
        zip_path = path + ".zip"
    members = []
    parent = os.path.dirname(os.path.abspath(zip_path))
    for ts in times:
        member = os.path.join(parent, _gtiff_slice_name(ts, uuid.uuid4().hex))
        ds[value_col].sel({time_col: ts}).rio.to_raster(member)
        members.append(member)
    with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for m in members:
            zf.write(m)
    for m in members:
        os.remove(m)
    return zip_path


def _try_raster_export(
    df: DataFrame,
    path: str,
    fmt: str,
    value_col: str | None = None,
    dim_cols: list[str] | None = None,
) -> bool:
    """Driver-side small-result raster export (the reference writes real
    COGs/netcdf/zarr, minibackend/custom_processes.py:115-219). Only
    valid for results that fit the driver; returns False when the geo
    stack isn't importable so the caller can fall back honestly.

    ``value_col``/``dim_cols`` are explicit when the caller (CubeFrame)
    knows them; the last-column fallback is only for bare DataFrames and
    would mis-index a frame whose value column is not last.
    """
    try:
        import xarray  # noqa: F401
    except ImportError:
        return False
    if value_col is None:
        value_col = df.columns[-1]
    if dim_cols is None:
        dim_cols = [c for c in df.columns if c != value_col]
    pdf = df.toPandas()
    ds = pdf.set_index(dim_cols).to_xarray()
    if fmt == "netcdf":
        ds.to_netcdf(path)
    elif fmt == "zarr":
        ds.to_zarr(path, mode="w")
    else:  # gtiff needs rioxarray
        try:
            import rioxarray  # noqa: F401
        except ImportError:
            return False
        _export_gtiff(ds, pdf, path, value_col, dim_cols)
    return True


def save_result(
    df: DataFrame,
    path: str,
    format: str = "parquet",
    value_col: str | None = None,
    dim_cols: list[str] | None = None,
    **options,
) -> str:
    """Sink dispatch: parquet (default) / csv / json distributed writes —
    one file per partition, no driver collect. gtiff and zarr are
    DISTRIBUTED sinks (executor-side tile/chunk encode, driver-side
    manifest/metadata only); netcdf writes netCDF3-classic through the
    pure-numpy sink (executor slab encode, driver streams the single
    sequential file) with no geo-stack dependency (r13)."""
    import warnings

    fmt = format.lower()
    if fmt == "gtiff":
        # DISTRIBUTED gtiff sink (pure-numpy encoder, io/gtiff.py): one
        # single-band tile per non-spatial dim group, encoded and
        # written on the executors; the driver only sees the manifest
        # (written as parquet under <path>/_manifest). Falls through to
        # the legacy driver-side export only when no x/y dims are
        # identifiable.
        import os

        from openeo_processes_dask_ml_spark.io.gtiff import (
            write_gtiff_tiles,
        )

        vc = value_col if value_col is not None else df.columns[-1]
        dc = (
            dim_cols
            if dim_cols is not None
            else [c for c in df.columns if c != vc]
        )
        x_col = next(
            (c for c in dc if c.lower() in ("x", "lon", "lng", "longitude")),
            None,
        )
        y_col = next(
            (c for c in dc if c.lower() in ("y", "lat", "latitude")), None
        )
        if x_col and y_col:
            group_cols = [c for c in dc if c not in (x_col, y_col)]
            tiles = df
            if not group_cols:
                tiles = df.withColumn("tile", F.lit("tile"))
                group_cols = ["tile"]
            # forward the encoder layout options the sink supports
            # (ADVICE r8: compression/tile/predictor/overview_levels
            # were silently ignored before) and reject unknown keys —
            # a typo'd option must not silently produce a different
            # file layout
            known = {
                "epsg", "dtype", "compression", "tile", "predictor",
                "overview_levels",
            }
            unknown = set(options) - known
            if unknown:
                raise ValueError(
                    f"save_result(gtiff): unknown options {sorted(unknown)}; "
                    f"supported: {sorted(known)}"
                )
            manifest = write_gtiff_tiles(
                tiles,
                path,
                group_cols=group_cols,
                value_col=vc,
                x_col=x_col,
                y_col=y_col,
                epsg=options.get("epsg"),
                dtype=options.get("dtype", "float64"),
                compression=options.get("compression"),
                tile=options.get("tile"),
                predictor=options.get("predictor", 1),
                overview_levels=options.get("overview_levels", 0),
            )
            manifest.write.mode("overwrite").parquet(
                os.path.join(path, "_manifest")
            )
            return path
    if fmt == "zarr":
        # DISTRIBUTED zarr v2 sink (pure stdlib+numpy, io/zarr.py):
        # executor tasks write the chunk files, the driver writes only
        # axis coordinates + JSON metadata — no geo stack, no toPandas.
        # (The reference's save_result writes zarr via xarray on one
        # machine, minibackend/custom_processes.py:115-118.)
        from openeo_processes_dask_ml_spark.io.zarr import write_zarr_cube

        vc = value_col if value_col is not None else df.columns[-1]
        dc = (
            dim_cols
            if dim_cols is not None
            else [c for c in df.columns if c != vc]
        )
        known = {"chunks", "dtype", "attrs"}
        unknown = set(options) - known
        if unknown:
            raise ValueError(
                f"save_result(zarr): unknown options {sorted(unknown)}; "
                f"supported: {sorted(known)}"
            )
        write_zarr_cube(
            df,
            path,
            value_col=vc,
            dim_cols=dc,
            chunks=options.get("chunks"),
            dtype=options.get("dtype", "float64"),
            attrs=options.get("attrs"),
        )
        return path
    if fmt == "netcdf":
        # netCDF3-classic sink (pure numpy, io/netcdf3.py, r13):
        # executor-encoded leading-dim slabs streamed to one file by
        # the driver — no xarray/netCDF4 needed, the parquet fallback
        # is gone. (The reference's to_netcdf ships the geo stack,
        # minibackend/custom_processes.py:115-118.)
        from openeo_processes_dask_ml_spark.io.netcdf3 import (
            write_netcdf3_cube,
        )

        vc = value_col if value_col is not None else df.columns[-1]
        dc = (
            dim_cols
            if dim_cols is not None
            else [c for c in df.columns if c != vc]
        )
        known = {"dtype", "attrs"}
        unknown = set(options) - known
        if unknown:
            raise ValueError(
                f"save_result(netcdf): unknown options {sorted(unknown)}; "
                f"supported: {sorted(known)}"
            )
        write_netcdf3_cube(
            df,
            path,
            value_col=vc,
            dim_cols=dc,
            dtype=options.get("dtype", "float64"),
            attrs=options.get("attrs"),
        )
        return path
    if fmt in RASTER_FORMATS:
        if _try_raster_export(df, path, fmt, value_col, dim_cols):
            return path
        warnings.warn(
            f"save_result: raster format {format!r} requires the geo "
            f"stack (xarray/rioxarray), which is not installed — "
            f"writing parquet to {path} instead",
            UserWarning,
            stacklevel=2,
        )
        fmt = "parquet"
    writer = df.write.mode("overwrite")
    if fmt == "csv":
        writer = writer.option("header", "true")
    getattr(writer, fmt)(path, **options)
    return path


def compact_table(
    spark: SparkSession,
    path: str,
    out_path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Small-files compaction: rewrite a parquet table into files of
    ~``target_file_bytes`` and return the ACTUAL output file count
    (measured on the written table — the computed partition target can
    overshoot it when coalesce is bounded by the scan's partition
    count or when empty partitions write no file; ADVICE r6).

    The small-files problem is operational, not logical: a 100 TB
    table accreted from streaming micro-batches or per-shard appends
    can hold millions of KB-sized files, and every downstream scan
    pays one open/footer-read per file (plus driver-side listing).
    Sizing is measured through the Hadoop FileSystem API (works for
    local/HDFS/S3A alike), so the repartition count reflects actual
    bytes rather than row guesses. The rewrite is one shuffle-free
    coalesce when shrinking; Spark picks repartition when growing.
    """
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(hconf)
    total = fs.getContentSummary(hpath).getLength()
    n_out = max(1, -(-int(total) // int(target_file_bytes)))
    df = spark.read.parquet(path)
    n_in = len(df.inputFiles())
    writer = (df.coalesce(n_out) if n_out <= n_in else df.repartition(n_out))
    writer.write.mode("overwrite").parquet(out_path)
    return len(spark.read.parquet(out_path).inputFiles())
