from openeo_processes_dask_ml_spark.operators.aggregate import aggregate_spatial
from openeo_processes_dask_ml_spark.operators.arrays import array_interpolate_linear
from openeo_processes_dask_ml_spark.operators.indices import ndvi

__all__ = ["aggregate_spatial", "array_interpolate_linear", "ndvi"]
