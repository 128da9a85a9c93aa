"""Deterministic sampling (operators/sampling.py)."""

import pytest
from pyspark.sql import functions as F

from postgraph_spark.operators.sampling import (
    deterministic_sample,
    stratified_sample,
)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.range(10000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 3 == 0, "en").otherwise("de").alias("lang"),
    )


def test_reproducible_and_partition_stable(spark, docs):
    a = sorted(r.doc_id for r in deterministic_sample(docs, ["doc_id"], 0.3).collect())
    b = sorted(
        r.doc_id
        for r in deterministic_sample(docs.repartition(17), ["doc_id"], 0.3).collect()
    )
    assert a == b and len(a) > 0


def test_fraction_accuracy(spark, docs):
    n = deterministic_sample(docs, ["doc_id"], 0.25).count()
    assert abs(n / 10000 - 0.25) < 0.02


def test_nested_fractions_subset(spark, docs):
    # smaller fraction with same key/salt is a strict subset: hash < t1
    # implies hash < t2 for t1 < t2 — lets pipelines grow a sample
    # without reshuffling membership
    small = {r.doc_id for r in deterministic_sample(docs, ["doc_id"], 0.1).collect()}
    big = {r.doc_id for r in deterministic_sample(docs, ["doc_id"], 0.3).collect()}
    assert small <= big


def test_salts_independent(spark, docs):
    a = {r.doc_id for r in deterministic_sample(docs, ["doc_id"], 0.2, salt="t").collect()}
    b = {r.doc_id for r in deterministic_sample(docs, ["doc_id"], 0.2, salt="v").collect()}
    inter = len(a & b) / max(len(a), 1)
    assert 0.1 < inter < 0.3  # ~0.2 expected under independence


def test_stratified_fractions(spark, docs):
    out = stratified_sample(docs, "lang", {"en": 0.6}, ["doc_id"], default=0.05)
    counts = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    n_en = docs.filter(F.col("lang") == "en").count()
    n_de = docs.filter(F.col("lang") == "de").count()
    assert abs(counts.get("en", 0) / n_en - 0.6) < 0.05
    assert abs(counts.get("de", 0) / n_de - 0.05) < 0.03


def test_bad_fraction_rejected(spark, docs):
    with pytest.raises(ValueError):
        deterministic_sample(docs, ["doc_id"], 1.5)


def test_scrub_pii_and_counts(spark):
    from postgraph_spark.functions.text import pii_counts, scrub_pii

    df = spark.createDataFrame(
        [
            ("mail a@b.co and c.d@e.org now", "<EMAIL>", 2),
            ("ip 10.0.0.1 ok", "<IP>", 0),
            ("call 555-123-4567", "<PHONE>", 0),
            ("card 4111111111111111 here", "<NUM>", 0),
            ("clean text 123", None, 0),
        ],
        ["t", "expect", "n_email"],
    )
    from pyspark.sql import functions as F

    rows = df.select(
        "t", "expect", "n_email",
        scrub_pii("t").alias("s"),
        pii_counts("t").alias("c"),
    ).collect()
    for r in rows:
        if r.expect:
            assert r.expect in r.s, (r.t, r.s)
        else:
            assert r.s == r.t
        assert r.c.email == r.n_email, (r.t, r.c)
    # sequential counting: the IP's dotted quad must NOT also count as
    # a phone or digit run
    one = df.filter("t like 'ip %'").select(pii_counts("t").alias("c")).first().c
    assert (one.ip, one.phone, one.num) == (1, 0, 0)
