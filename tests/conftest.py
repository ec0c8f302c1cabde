import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402

# Processing expressions are DISABLED by default (reference posture,
# constants.py:76-87; VERDICT r6 item 5). The suite exercises the
# resolver across graph/inference/ViT tests, so opt in once here; the
# default-off contract itself is asserted in
# test_graph_and_registry.py::test_expressions_disabled_by_default,
# which removes the variable.
os.environ.setdefault("OPENEO_SPARK_ENABLE_PROC_EXPRESSIONS", "1")


@pytest.fixture(scope="session")
def spark():
    s = (
        SparkSession.builder.appName("tests")
        .master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "6g")
        .getOrCreate()
    )
    yield s
    s.stop()


SF_DIR = "/root/testdata/sf0.001"
