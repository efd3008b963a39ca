import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)


@pytest.fixture(scope="session")
def spark():
    """One shared local SparkSession for all integration tests (same conf
    module as bench/production so the paths never drift)."""
    from pyspark.sql import SparkSession

    from probably_jl_spark.conf import apply_conf, sketch_build_conf

    builder = (
        SparkSession.builder.master("local[4]")
        .appName("probably-jl-spark-tests")
        .config("spark.ui.enabled", "false")
    )
    spark = apply_conf(builder, sketch_build_conf("local", cores=4)).getOrCreate()
    yield spark
    spark.stop()


def hash_stream(n: int, seed: int = 0) -> np.ndarray:
    """Deterministic stream of n distinct-ish uint64 'item hashes' (FIXTURES.md §3)."""
    rs = np.random.default_rng(seed)
    return rs.integers(0, 2**64, size=n, dtype=np.uint64)
