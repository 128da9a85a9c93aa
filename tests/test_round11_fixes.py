"""Round-11 pins: lazy plan construction on the registry surface
(ADVICE r10), the adamic-adar hot-bucket cap, winnowing chunking, and
the ExactSubstr operator's behavior guards."""

import os
import sys

import pytest
from pyspark.sql import DataFrame

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.conftest import SF_DIR  # noqa: E402

from postgraph_spark.queries.registry import QUERIES, parquet_rows  # noqa: E402


def test_parquet_rows_matches_scan(spark):
    n_footer = parquet_rows(SF_DIR, "documents")
    n_scan = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet")).count()
    assert n_footer == n_scan


@pytest.mark.parametrize(
    "name", ["dedup_jaccard_pairs", "minhash_jaccard_estimate", "pack_sequences"]
)
def test_registry_plan_build_is_lazy(spark, name, monkeypatch):
    """ADVICE r10: the size-probed operators must not run a hidden
    count job (or eager checkpoint) when their REGISTERED wrappers
    build a plan — n_docs now comes from the parquet footer."""

    def _boom(self):
        raise AssertionError("plan construction ran a Spark count job")

    monkeypatch.setattr(DataFrame, "count", _boom)
    monkeypatch.setattr(
        DataFrame,
        "localCheckpoint",
        lambda self, eager=True: (_ for _ in ()).throw(
            AssertionError("plan construction ran an eager checkpoint")
        ),
    )
    df = QUERIES[name](spark, SF_DIR)
    assert df.columns  # plan built without any eager job
