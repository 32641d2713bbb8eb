"""Shared pytest fixtures: one SparkSession per test session."""

from __future__ import annotations

import os
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"

# R14 token-plumbing fixture env var: must exist BEFORE the JVM starts —
# Python DataSource planning workers inherit the launch environment, so
# a mid-test os.environ change never reaches them (same rule applies in
# production: export the PAT before spark-submit).
os.environ.setdefault("FAKE_REST_PAT", "s3cret")


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    from hapiy_etl_spark.session import get_spark

    s = get_spark("hapiy_etl_spark_tests")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    # override to replay parity at the driver's sf0.01:
    #   SPARK_GRAFT_TEST_SF_DIR=/root/testdata/sf0.01 pytest tests/test_oracle_parity.py
    return os.environ.get("SPARK_GRAFT_TEST_SF_DIR", SF_SMOKE)
