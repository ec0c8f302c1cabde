"""PySpark-native rebuild of Open-EO/openeo-processes-dask-ml.

A datacube + ML-inference engine re-expressed Spark-first: labeled
N-dimensional cubes become long/tidy DataFrames, openEO process graphs
compile to a single Catalyst logical plan, and model inference runs as
Arrow-batched ``mapInPandas`` stages instead of the reference's
``.npy``-spill + subprocess barrier (reference:
openeo_processes_dask_ml/process_implementations/data_model/data_model.py:1024-1167).
"""

from openeo_processes_dask_ml_spark.cube import CubeFrame
from openeo_processes_dask_ml_spark.session import get_spark

__all__ = ["CubeFrame", "get_spark"]
__version__ = "0.1.0"
