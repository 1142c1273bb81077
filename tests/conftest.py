from __future__ import annotations

import pytest

from fast_duplicate_finder_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("fdf-tests", cores=4, shuffle_partitions=8)
    yield s
    s.stop()
