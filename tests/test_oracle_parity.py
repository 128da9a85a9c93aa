"""Every registered query must hash-match its DuckDB oracle at sf0.01 —
the local mirror of the driver's correctness gate."""

import pytest

from postgraph_spark.queries import ORACLES, QUERIES
from tests.conftest import SF_DIR
from tests.oracle_harness import compare


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(spark, name):
    ok, msg = compare(name, spark, QUERIES[name], ORACLES[name], SF_DIR)
    assert ok, msg


def test_all_queries_run(spark):
    """Queries without oracles must still execute and return a schema."""
    for name, fn in QUERIES.items():
        if name in ORACLES:
            continue
        df = fn(spark, SF_DIR)
        assert df.columns, name
