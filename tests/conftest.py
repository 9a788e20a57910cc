from __future__ import annotations

import pytest

from abecto_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="abecto_spark_tests", master="local[4]", shuffle_partitions=4)
    yield s


def rows_set(df, *cols):
    """Set of tuples for order-insensitive assertions."""
    sel = df.select(*cols) if cols else df
    return {tuple(r) for r in sel.collect()}
