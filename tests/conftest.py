import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_SMOKE = os.environ.get("SPARK_GRAFT_SMOKE_DIR", "/root/testdata/sf0.001")
SF_CORRECT = os.environ.get("SPARK_GRAFT_CORRECT_DIR", "/root/testdata/sf0.01")


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running gates (bench regression at sf0.1)")


@pytest.fixture(scope="session")
def spark():
    from miniodb_spark.session import get_spark

    spark = get_spark("miniodb_spark_tests", cpus=os.environ.get("SPARK_GRAFT_CPUS", "8"))
    yield spark


@pytest.fixture(scope="session")
def sf_dir():
    return SF_SMOKE


@pytest.fixture()
def engine(spark, tmp_path):
    from miniodb_spark.engine import Engine

    return Engine(spark, str(tmp_path / "store"))
