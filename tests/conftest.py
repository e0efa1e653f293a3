from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")


@pytest.fixture(scope="session")
def spark():
    from tokcodec.session import get_spark

    s = get_spark(master="local[8]", app_name="tokcodec-tests",
                  shuffle_partitions=8, driver_memory="8g")
    yield s
    s.stop()
