"""Shared Spark fixture: one local session per test run.

Small shuffle-partition count keeps tiny-fixture shuffles fast; the session
is the same tuned build the engine uses (UTC, AQE, Arrow) so tests see
production semantics.
"""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from data_engineering_assignment_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", cpus=4, shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return "/root/testdata/sf0.001"
