import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_SMOKE = os.environ.get("SPARK_GRAFT_SMOKE_DIR", "/root/testdata/sf0.001")
SF_CORRECT = os.environ.get("SPARK_GRAFT_CORRECT_DIR", "/root/testdata/sf0.01")


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running gates (bench regression at sf0.1)")
    config.addinivalue_line(
        "markers",
        "storm: contended-host soaks — cross-process tests run under a "
        "deliberate background CPU load, asserting invariants (no loss, "
        "no duplicates, bounded retries) rather than wall-clock success. "
        "Opt-in: run with `-m storm` (r13 verdict #4).")


def pytest_collection_modifyitems(config, items):
    # storm tests saturate the host on purpose: never run them as part
    # of the default suite — only when explicitly selected via -m
    expr = config.getoption("-m") or ""
    if "storm" in expr:
        return
    skip = pytest.mark.skip(reason="storm soak: opt-in via -m storm")
    for item in items:
        if "storm" in item.keywords:
            item.add_marker(skip)


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
