"""Driver-facing output contract: no registered query may return a
top-level container (array/map/struct) column.

The driver's correctness gate canonicalizes result frames with pandas
``sort_values`` over every column, which crashes on unhashable values
(CORRECTNESS_r09 `multimodal_decode`: "unhashable type: 'list'").
Containers must be flattened to scalar columns (f0..f7) or serialized
to canonical JSON text before a query is registered. Internal operators
are free to keep array columns — the contract applies only to the
registry surface the driver compares.
"""

import pytest
from pyspark.sql import types as T

from postgraph_spark.queries import QUERIES
from tests.conftest import SF_DIR

CONTAINER_TYPES = (T.ArrayType, T.MapType, T.StructType)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_no_toplevel_container_columns(spark, name):
    df = QUERIES[name](spark, SF_DIR)
    bad = [
        f.name for f in df.schema.fields if isinstance(f.dataType, CONTAINER_TYPES)
    ]
    assert not bad, (
        f"{name} returns top-level container column(s) {bad}; the driver's "
        "pandas canonicalizer cannot sort these — flatten to scalars or "
        "serialize to JSON text"
    )
