"""Shared fixtures: one SparkSession and one DuckDB connection for the
whole run (session startup is ~8s; every test reuses it)."""

from __future__ import annotations

import os
import sys

import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

#: Correctness tests run at the smallest scale factor; the driver's gate
#: re-runs the same oracles at sf0.01.
SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from datafusion_gpu_spark.context import get_spark

    s = get_spark("datafusion-gpu-spark-tests")
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def duck():
    from tools.check_oracle import duck_connect

    return duck_connect(SF_DIR)
