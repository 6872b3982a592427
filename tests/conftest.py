from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

from kwery_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("kwery-tests", cpus=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_SMOKE


@pytest.fixture(scope="session")
def oracle_sf_dir():
    return SF_ORACLE


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: full-registry sweeps (~30s+); deselect with -m 'not slow'"
    )
