from openeo_processes_dask_ml_spark.graph.executor import execute_graph
from openeo_processes_dask_ml_spark.graph.registry import ProcessRegistry, default_registry

__all__ = ["execute_graph", "ProcessRegistry", "default_registry"]
