from __future__ import annotations

import pytest

from datapipeline_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="datapipeline-spark-tests", master="local[4]", shuffle_partitions=4)
    yield s


def rows(df, *order_cols):
    """Collect to plain tuples sorted by the given columns for stable asserts."""
    if order_cols:
        df = df.orderBy(*order_cols)
    return [tuple(r) for r in df.collect()]
