from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_CPUS", "8")  # keep test sessions light


@pytest.fixture(scope="session")
def spark():
    from sparkdoc.session import get_spark

    s = get_spark("sparkdoc-tests", shuffle_partitions=8)
    yield s
    s.stop()
