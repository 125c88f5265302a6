from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from propius_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    # Tiny fixtures: a small master + few shuffle partitions keeps each
    # action's scheduling overhead low (the suite is overhead-bound, not
    # compute-bound). Production sizing lives in propius_spark.session.
    s = get_spark("propius_spark_tests", cpus=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
