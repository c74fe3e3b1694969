from __future__ import annotations

import os
import sys

import pytest

# Make bare `pytest` work from the repo root (it doesn't add cwd to sys.path
# the way `python -m pytest` does, so dumpr_spark wouldn't import).
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_CPUS", "8")  # keep local test JVM small


@pytest.fixture(scope="session")
def spark():
    from dumpr_spark.session import get_spark

    s = get_spark("dumpr_spark_tests", cpus=int(os.environ["SPARK_GRAFT_CPUS"]))
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def engine(spark, sf_dir):
    from dumpr_spark.engine import Engine

    return Engine(spark).load_dir(sf_dir)
