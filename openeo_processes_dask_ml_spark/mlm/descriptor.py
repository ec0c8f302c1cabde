"""STAC-MLM model descriptors.

Parses the ``mlm:*`` properties of a STAC Item into dataclasses and
validates a cube against the model's input spec — the Spark analog of
the reference's MLModel ABC (reference: data_model/data_model.py:52-102)
and its three pre-predict checks (dims present :222-247, dim sizes
:249-295, bands available :297-373).
"""

from __future__ import annotations

import json
import os
import urllib.request
from dataclasses import dataclass, field

from openeo_processes_dask_ml_spark.utils.dim_utils import resolve_bands, resolve_dim
from openeo_processes_dask_ml_spark.utils.scaling import ValueScaling

MLM_SCHEMA_PREFIX = "https://stac-extensions.github.io/mlm/"
SUPPORTED_FRAMEWORKS = {"pytorch", "scikit-learn", "sklearn", "spark-mllib", "fake"}


@dataclass
class ModelBand:
    name: str
    format: str | None = None  # e.g. "python"
    expression: str | None = None  # e.g. "(B08-B04)/(B08+B04)"

    @classmethod
    def parse(cls, raw) -> "ModelBand":
        if isinstance(raw, str):
            return cls(name=raw)
        return cls(
            name=raw["name"], format=raw.get("format"), expression=raw.get("expression")
        )


@dataclass
class ProcessingExpression:
    format: str
    expression: str


@dataclass
class ModelInput:
    bands: list[ModelBand] = field(default_factory=list)
    shape: list[int] = field(default_factory=list)  # -1 = unbounded
    dim_order: list[str] = field(default_factory=list)
    data_type: str = "float32"
    value_scaling: list[ValueScaling] | None = None
    pre_processing_function: ProcessingExpression | None = None

    @classmethod
    def parse(cls, raw: dict) -> "ModelInput":
        inp = raw.get("input", {})
        scaling_raw = raw.get("value_scaling") or []
        if isinstance(scaling_raw, dict):
            scaling_raw = [scaling_raw]
        pre = raw.get("pre_processing_function")
        return cls(
            bands=[ModelBand.parse(b) for b in raw.get("bands", [])],
            shape=list(inp.get("shape", [])),
            dim_order=list(inp.get("dim_order", [])),
            data_type=inp.get("data_type", "float32"),
            value_scaling=[ValueScaling.from_dict(s) for s in scaling_raw] or None,
            pre_processing_function=(
                ProcessingExpression(pre["format"], pre["expression"]) if pre else None
            ),
        )


@dataclass
class ModelOutput:
    shape: list[int] = field(default_factory=list)
    dim_order: list[str] = field(default_factory=list)
    data_type: str = "float32"
    post_processing_function: ProcessingExpression | None = None
    classes: list[dict] = field(default_factory=list)

    @classmethod
    def parse(cls, raw: dict) -> "ModelOutput":
        res = raw.get("result", {})
        post = raw.get("post_processing_function")
        return cls(
            shape=list(res.get("shape", [])),
            dim_order=list(res.get("dim_order", [])),
            data_type=res.get("data_type", "float32"),
            post_processing_function=(
                ProcessingExpression(post["format"], post["expression"]) if post else None
            ),
            classes=list(raw.get("classification:classes", [])),
        )


@dataclass
class MLModelDescriptor:
    """Parsed STAC-MLM Item + chosen input/output spec + artifact ref."""

    item: dict
    input: ModelInput
    output: ModelOutput
    framework: str
    model_asset_href: str | None = None
    pretrained: bool = True
    batch_size_suggestion: int | None = None
    artifact_path: str | None = None  # local path once staged

    @property
    def name(self) -> str:
        return self.item.get("id", "model")

    def stage(self, cache_dir: str | None = None) -> str:
        """Fetch the weights asset into the content-addressed cache
        (reference data_model.py:142-165) and remember the local path."""
        from openeo_processes_dask_ml_spark.mlm.artifacts import stage_artifact

        if self.model_asset_href is None:
            raise ValueError("descriptor has no mlm:model asset to stage")
        self.artifact_path = stage_artifact(self.model_asset_href, cache_dir)
        return self.artifact_path


def _select_model_asset(item: dict, model_asset: str | None) -> str | None:
    assets = item.get("assets", {})
    if model_asset is not None:
        if model_asset not in assets:
            raise ValueError(f"asset {model_asset!r} not found in item")
        return assets[model_asset].get("href")
    for asset in assets.values():
        roles = asset.get("roles", []) or []
        if "mlm:model" in roles:
            return asset.get("href")
    return None


def load_stac_ml(
    uri_or_item: str | dict,
    model_asset: str | None = None,
    input_index: int = 0,
    output_index: int = 0,
    validate_schema: bool = True,
) -> MLModelDescriptor:
    """Load + validate a STAC-MLM Item (reference
    process_implementations/load_model.py:20-98): check the MLM schema
    is declared, validate the item against the vendored MLM jsonschema
    (the offline analog of the reference's hosted-schema validation,
    load_model.py:36 + init_models.py:240 — see ``mlm/schema.py``),
    check the framework is one this engine can execute, and the
    requested input/output indexes exist; select the weights asset by
    role ``mlm:model``. ``validate_schema=False`` skips only the
    jsonschema pass (for deliberately minimal in-code items)."""
    if isinstance(uri_or_item, dict):
        item = uri_or_item
    elif uri_or_item.startswith(("http://", "https://")):
        with urllib.request.urlopen(uri_or_item, timeout=30) as r:  # noqa: S310
            item = json.load(r)
    else:
        with open(os.path.expanduser(uri_or_item)) as f:
            item = json.load(f)

    exts = item.get("stac_extensions", [])
    if not any(e.startswith(MLM_SCHEMA_PREFIX) for e in exts):
        raise ValueError("item does not declare the STAC-MLM extension")
    if validate_schema:
        from openeo_processes_dask_ml_spark.mlm.schema import validate_mlm_item

        validate_mlm_item(item)
    props = item.get("properties", {})
    framework = (props.get("mlm:framework") or "").lower()
    if framework not in SUPPORTED_FRAMEWORKS:
        raise ValueError(f"unsupported framework {framework!r}")
    inputs = props.get("mlm:input", [])
    outputs = props.get("mlm:output", [])
    if not (0 <= input_index < len(inputs)):
        raise IndexError(f"input_index {input_index} out of range ({len(inputs)})")
    if not (0 <= output_index < len(outputs)):
        raise IndexError(f"output_index {output_index} out of range ({len(outputs)})")

    return MLModelDescriptor(
        item=item,
        input=ModelInput.parse(inputs[input_index]),
        output=ModelOutput.parse(outputs[output_index]),
        framework=framework,
        model_asset_href=_select_model_asset(item, model_asset),
        pretrained=bool(props.get("mlm:pretrained", True)),
        batch_size_suggestion=props.get("mlm:batch_size_suggestion"),
    )


# -- validation against a cube ---------------------------------------------


def check_dimensions_present(descriptor: MLModelDescriptor, cube_dims: list[str]) -> None:
    """Every non-batch model dim must resolve to a cube dim
    (reference data_model.py:222-247)."""
    missing = [
        d
        for d in descriptor.input.dim_order
        if d.lower() not in ("batch", "batches") and resolve_dim(d, cube_dims) is None
    ]
    if missing:
        raise ValueError(f"cube lacks model dims {missing}; cube dims: {cube_dims}")


def check_dimension_sizes(
    descriptor: MLModelDescriptor, cube_sizes: dict[str, int]
) -> None:
    """Cube extent must cover the model's input tile on every model dim
    (reference data_model.py:249-295). shape -1 = unbounded."""
    for dim, size in zip(descriptor.input.dim_order, descriptor.input.shape):
        if dim.lower() in ("batch", "batches") or size == -1:
            continue
        cube_dim = resolve_dim(dim, cube_sizes.keys())
        if cube_dim is None:
            continue  # presence is check #1's job
        if cube_sizes[cube_dim] < size:
            raise ValueError(
                f"dim {cube_dim!r} has size {cube_sizes[cube_dim]} < model "
                f"input {size}"
            )


def derived_bands_to_compute(
    bands: list[ModelBand], cube_bands: list[str]
) -> list[ModelBand]:
    """The model bands that must be COMPUTED from their expression: they
    carry one, and the cube doesn't already provide the band directly
    (reference data_model.py:340-343 prefers the direct band)."""
    direct = resolve_bands(
        [b.name for b in bands if b.expression is not None or b.format is not None],
        cube_bands,
    )
    return [
        b
        for b in bands
        if (b.expression is not None or b.format is not None)
        and b.name not in direct
    ]


def check_bands_available(
    descriptor: MLModelDescriptor, cube_bands: list[str]
) -> dict[str, str]:
    """Every model band must be present (alias-resolved) or computable
    from an expression (reference data_model.py:297-373). Returns the
    name mapping model-band -> cube label; derived bands map to their
    own name (they materialize as new band rows before tiling).

    Where the reference stops at "computable" with two `todo`s
    (data_model.py:362-367), this check actually verifies both: the
    expression parses against the supported band-math grammar, and
    every band it references resolves against the cube.
    """
    from openeo_processes_dask_ml_spark.mlm.band_expr import referenced_bands

    to_compute = derived_bands_to_compute(descriptor.input.bands, cube_bands)
    compute_names = {b.name for b in to_compute}
    for b in to_compute:
        if (b.format is None) != (b.expression is None):
            # reference parity: both-or-neither (data_model.py:352-360)
            raise ValueError(
                f'Properties "format" and "expression" are both required, '
                f"but only one was given for band with name {b.name}."
            )
        refs = referenced_bands(b.expression)
        rmap = resolve_bands(refs, cube_bands)
        missing_refs = [r for r in refs if r not in rmap]
        if missing_refs:
            raise ValueError(
                f"derived band {b.name!r} references bands {missing_refs} "
                f"not present in the cube; cube has {cube_bands}"
            )
    plain = [b.name for b in descriptor.input.bands if b.name not in compute_names]
    mapping = resolve_bands(plain, cube_bands)
    missing = [n for n in plain if n not in mapping]
    if missing:
        raise ValueError(f"cube lacks model bands {missing}; cube has {cube_bands}")
    mapping.update({n: n for n in compute_names})
    return mapping


def validate_cube(
    descriptor: MLModelDescriptor,
    cube_dims: list[str],
    cube_sizes: dict[str, int],
    cube_bands: list[str],
) -> dict[str, str]:
    check_dimensions_present(descriptor, cube_dims)
    check_dimension_sizes(descriptor, cube_sizes)
    return check_bands_available(descriptor, cube_bands)
