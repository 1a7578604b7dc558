from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from id3c_spark.session import get_spark

SF_SMALL = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    # Lazily generated oracles (VALUES-literal mirrors) must read the same
    # fixture the queries run against.
    os.environ["ID3C_ORACLE_SF_DIR"] = SF_SMALL
    return SF_SMALL
