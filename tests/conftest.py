from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nifi_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    # small local session for tests: 4 cores keeps startup + shuffles fast
    s = get_spark("nifi-spark-tests", parallelism=4, shuffle_partitions=8)
    yield s
    s.stop()
