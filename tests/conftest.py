from __future__ import annotations

import pytest

from mex_extractors_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="mex-spark-tests", cores=8, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf001():
    return "/root/testdata/sf0.001"
