"""Model artifact staging: download + content-addressed cache + ship
to executors.

The reference downloads weights as a dask-delayed task into a cache dir
keyed by a sanitized URL hash (reference: utils/download_utils.py:14-94,
utils/model_cache_utils.py:7-66, data_model.py:142-165). Spark version:
the download happens ONCE on the driver (not per worker), the file is
cached content-addressed, and ``SparkContext.addFile`` distributes it to
every executor exactly once — executors resolve it via
``SparkFiles.get`` inside the inference UDF.
"""

from __future__ import annotations

import hashlib
import os
import re
import shutil
import urllib.request

DEFAULT_CACHE_DIR = os.environ.get(
    "OPENEO_SPARK_MODEL_CACHE_DIR", os.path.join(".", "cache", "model_cache")
)
_DOWNLOAD_CHUNK = 8192  # reference download_utils.py:15
_TIMEOUT_S = 30  # reference download_utils.py:19


def sanitize_uri(uri: str) -> str:
    """Filesystem-safe cache key component from a URI (the reference's
    URL sanitization, model_cache_utils.py:7-66)."""
    tail = uri.rstrip("/").rsplit("/", 1)[-1][:80]
    safe = re.sub(r"[^A-Za-z0-9._-]", "_", tail)
    return safe or "artifact"


def cache_path_for(uri: str, cache_dir: str | None = None) -> str:
    digest = hashlib.sha256(uri.encode()).hexdigest()[:16]
    return os.path.join(
        cache_dir or DEFAULT_CACHE_DIR, f"{digest}-{sanitize_uri(uri)}"
    )


def _download_s3(uri: str, target: str) -> None:
    """s3://bucket/key download (reference download_utils.py:59-84):
    credentialed client when key env vars are set, anonymous (unsigned)
    otherwise. boto3 is not bundled here, so the path is import-gated
    with a clear error instead of a crash mid-inference."""
    try:
        import boto3
        from botocore import UNSIGNED
        from botocore.config import Config
    except ImportError as exc:
        raise NotImplementedError(
            "s3:// artifact URIs need boto3/botocore, which are not "
            "installed in this environment — stage the artifact to "
            "http(s) or a local path instead"
        ) from exc
    bucket, _, key = uri[len("s3://") :].partition("/")
    access_key = os.environ.get("OPENEO_SPARK_S3_ACCESS_KEY_ID")
    secret_key = os.environ.get("OPENEO_SPARK_S3_SECRET_ACCESS_KEY")
    endpoint = os.environ.get("OPENEO_SPARK_S3_ENDPOINT")
    if access_key and secret_key:
        client = boto3.client(
            "s3",
            aws_access_key_id=access_key,
            aws_secret_access_key=secret_key,
            endpoint_url=endpoint,
        )
    else:
        client = boto3.client(
            "s3", endpoint_url=endpoint, config=Config(signature_version=UNSIGNED)
        )
    client.download_file(bucket, key, target)


def stage_artifact(uri: str, cache_dir: str | None = None) -> str:
    """Fetch a model artifact to the local content-addressed cache
    (skip if present) and return the local path.

    Supports http(s), s3:// (credentialed or anonymous, import-gated on
    boto3) and local/file paths — the reference's download surface
    (download_utils.py:88-96)."""
    target = cache_path_for(uri, cache_dir)
    if os.path.exists(target):
        return target
    os.makedirs(os.path.dirname(target), exist_ok=True)
    tmp = target + ".part"
    if uri.startswith("s3://"):
        _download_s3(uri, tmp)
    elif uri.startswith(("http://", "https://")):
        req = urllib.request.Request(uri)
        with urllib.request.urlopen(req, timeout=_TIMEOUT_S) as r, open(  # noqa: S310
            tmp, "wb"
        ) as f:
            while True:
                chunk = r.read(_DOWNLOAD_CHUNK)
                if not chunk:
                    break
                f.write(chunk)
    else:
        src = uri[len("file://") :] if uri.startswith("file://") else uri
        shutil.copyfile(os.path.expanduser(src), tmp)
    os.replace(tmp, target)
    return target


def distribute_artifact(spark, uri: str, cache_dir: str | None = None) -> str:
    """Stage on the driver, ship via addFile; returns the basename that
    executors pass to ``SparkFiles.get`` (the executor-side analog of
    the reference's per-subprocess model path)."""
    local = stage_artifact(uri, cache_dir)
    spark.sparkContext.addFile(local)
    return os.path.basename(local)
