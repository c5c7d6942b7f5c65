import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    from pyspark.sql import SparkSession

    s = (
        SparkSession.builder.master("local[4]")
        .appName("dd-graphdb-tests")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture()
def people_graph(spark):
    """F1+F2 fixture (FIXTURES.md; reference executor.rs:658-715)."""
    from dd_graphdb_spark.graph import PropertyGraph

    v = spark.createDataFrame(
        [(1, "Person", "Alice", 30), (2, "Person", "Bob", 25), (3, "Person", "Charlie", 35)],
        "id long, label string, name string, age long",
    )
    e = spark.createDataFrame(
        [(1, 2, "friend", 2020), (2, 3, "friend", 2021)],
        "src long, dst long, label string, since long",
    )
    return PropertyGraph(v, e)
