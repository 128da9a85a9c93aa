"""Plan-shape regression tests — the scale properties the engine
promises (predicate pushdown through joins, no unguarded cartesians)
asserted against the OPTIMIZED plan, not timings."""

import re

import pytest

from postgraph_spark.engine import CypherEngine


@pytest.fixture(scope="module")
def engine(spark):
    e = CypherEngine(spark)
    e.execute("CREATE GRAPH shapes")
    e.execute("USE GRAPH shapes")
    pats = ", ".join(f"(:a {{x: {i}}}), (:b {{y: {i}}})" for i in range(6))
    e.execute(f"CREATE {pats}")
    return e


def optimized(engine, q):
    return engine.execute(q)._jdf.queryExecution().optimizedPlan().toString()


def test_and_conjuncts_push_below_cross_join(engine):
    """round-8: MATCH (a), (b) WHERE a.x = 1 AND b.y = 2 must filter
    each side BEFORE the join (the 3VL AND kernel used to lock both
    conjuncts above it, keeping an N x N cartesian)."""
    plan = optimized(
        engine,
        "MATCH (n:a), (m:b) WHERE n.x = 1 AND m.y = 2 RETURN n.x AS x, m.y AS y",
    )
    join_pos = plan.find("Join")
    assert join_pos != -1
    below = plan[join_pos:]
    # both sides carry their own Filter below the join
    assert below.count("Filter") >= 2, plan


def test_single_sided_where_pushes(engine):
    plan = optimized(
        engine, "MATCH (n:a), (m:b) WHERE n.x = 3 RETURN count(*) AS c"
    )
    join_pos = plan.find("Join")
    below = plan[join_pos:]
    assert "Filter" in below, plan


def test_values_and_results_match(engine):
    # semantics: the split must not change 3VL outcomes
    assert engine.fetch_values(
        "MATCH (n:a), (m:b) WHERE n.x = 1 AND m.y = 2 RETURN count(*) AS c"
    ) == [1]
    # null conjunct -> unknown -> row filtered (never true)
    assert engine.fetch_values(
        "MATCH (n:a) WHERE n.x = 1 AND n.missing = 1 RETURN count(*) AS c"
    ) == [0]
    assert engine.fetch_values(
        "MATCH (n:a) WHERE n.x >= 0 AND NOT (n.missing = 1) RETURN count(*) AS c"
    ) == [0]


# ------------------------- round-9 operator plan shapes (sf0.001 data)

SF = "/root/testdata/sf0.001"


def _physical(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bm25_plan_shape(spark):
    """bm25: the query-term table joins BROADCAST (never shuffles the
    postings on it) and no CartesianProduct appears anywhere."""
    from postgraph_spark.queries.llm_ops import bm25_topk

    plan = _physical(bm25_topk(spark, SF))
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_label_prop_no_cartesian(spark):
    from postgraph_spark.queries.llm_ops import label_prop_communities

    plan = _physical(label_prop_communities(spark, SF))
    assert "CartesianProduct" not in plan


def test_vle_deep_no_cartesian(spark):
    from postgraph_spark.queries.graph_queries import graph_vle_deep

    plan = _physical(graph_vle_deep(spark, SF))
    assert "CartesianProduct" not in plan


def test_perplexity_threshold_path_no_global_window(spark):
    """the scale path must contain NO partitionless window (the global
    ntile was the tree's only one; round-8 verdict #1)."""
    from postgraph_spark.queries.llm_ops import perplexity_buckets

    plan = _physical(perplexity_buckets(spark, SF, exact_max=0))
    assert "Window" not in plan, plan


def test_gopher_filter_pure_projection(spark):
    """the rule gate is one narrow map-side projection: no key shuffle
    (the only allowed Exchange is _spread's round-robin widening of a
    single-file local input — a no-op at scale), no Python."""
    from postgraph_spark.queries.llm_ops import gopher_quality_filter

    plan = _physical(gopher_quality_filter(spark, SF))
    assert "hashpartitioning" not in plan, plan
    assert "rangepartitioning" not in plan, plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_pack_sequences_bounded_window(spark):
    """the packing cumsum must be a PARTITIONED window whose corpus-side
    key includes the pack_shard sub-shard (source alone is fixed-
    cardinality — 1/20 of the corpus in one task at any scale). The
    shard-base prefix sum over the tiny per-shard totals table may
    window on source alone."""
    from postgraph_spark.queries.llm_ops import pack_sequences

    df = pack_sequences(spark, SF)
    opt = df._jdf.queryExecution().optimizedPlan().toString()
    win_lines = [
        line for line in opt.splitlines() if "windowspecdefinition" in line.lower()
    ]
    assert win_lines, opt  # the window must not be rewritten away silently
    for line in win_lines:
        assert "source" in line, line  # partition key present
    corpus_wins = [line for line in win_lines if "n_tok" in line]
    assert corpus_wins, opt
    for line in corpus_wins:
        assert "pack_shard" in line, line  # bounded sub-shard key present
    assert "broadcast" in opt.lower(), opt  # shard bases broadcast back


def test_pmi_no_cartesian_and_broadcast_marginals(spark):
    from postgraph_spark.queries.llm_ops import pmi_cooccurrence

    plan = _physical(pmi_cooccurrence(spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan, plan


def test_hits_no_cartesian(spark):
    from postgraph_spark.queries.llm_ops import hits_dupgraph

    plan = _physical(hits_dupgraph(spark, SF))
    assert "CartesianProduct" not in plan


def test_semdedup_no_cartesian(spark):
    from postgraph_spark.queries.llm_ops import semdedup_prune

    plan = _physical(semdedup_prune(spark, SF))
    assert "CartesianProduct" not in plan


def test_dsir_broadcast_model_no_corpus_join_shuffle(spark):
    """the DSIR bucket-stats table is capped at B=1024 rows, so the
    scoring join must be a broadcast — the corpus-side token stream
    never shuffles for the model (only the final per-doc agg does)."""
    from postgraph_spark.queries.llm_ops import dsir_importance

    plan = _physical(dsir_importance(spark, SF))
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan, plan


def test_source_kl_broadcast_totals_no_cartesian(spark):
    """source totals (source-cardinality) and the corpus total (1 row)
    must broadcast back; the only corpus-scale shuffle is the
    (source, word) count."""
    from postgraph_spark.queries.llm_ops import source_kl_unigram

    plan = _physical(source_kl_unigram(spark, SF))
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan


def test_adamic_adar_no_cartesian(spark):
    from postgraph_spark.queries.llm_ops import adamic_adar_linkpred

    plan = _physical(adamic_adar_linkpred(spark, SF))
    assert "CartesianProduct" not in plan


def test_lang_temperature_broadcast_rates(spark):
    """acceptance must be a broadcast of the tiny per-language rate
    table against the corpus — never a sort-merge join."""
    from postgraph_spark.queries.llm_ops import lang_temperature_sample

    plan = _physical(lang_temperature_sample(spark, SF))
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "CartesianProduct" not in plan


def test_char_entropy_no_python(spark):
    """the entropy signal is pure JVM aggregation — no Python workers
    in the plan."""
    from postgraph_spark.queries.llm_ops import char_entropy_quality

    plan = _physical(char_entropy_quality(spark, SF))
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan


# ------------------------- round-11 operator plan shapes


def test_exactsubstr_bucketed_not_all_pairs(spark):
    """ExactSubstr is a gram-keyed partial agg + equi-join + DOC-
    partitioned island windows — never an all-pairs doc join, never a
    partitionless window."""
    from postgraph_spark.queries.llm_ops import exactsubstr_spans

    df = exactsubstr_spans(spark, SF)
    plan = _physical(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    opt = df._jdf.queryExecution().optimizedPlan().toString()
    win_lines = [
        line for line in opt.splitlines() if "windowspecdefinition" in line.lower()
    ]
    assert win_lines, opt  # island merge must window, not sort globally
    for line in win_lines:
        assert "id" in line, line  # doc-partitioned


def test_adamic_adar_capped_adjacency_windows_are_keyed(spark, monkeypatch):
    """the round-11 caps add row_number windows — each must be KEYED
    (bucket / vertex), never partitionless. The round-11 lineage cuts
    (localCheckpoint on the bounded capped tables) would hide the cap
    subtrees behind LogicalRDD leaves, so checkpointing is neutralized
    for this structural check — the UNCUT plan is what carries the
    windows the caps compile to."""
    from postgraph_spark.queries.llm_ops import adamic_adar_linkpred

    cls = type(spark.range(1))  # the concrete (classic) DataFrame class
    monkeypatch.setattr(cls, "localCheckpoint", lambda self, eager=True: self)
    df = adamic_adar_linkpred(spark, SF)
    plan = _physical(df)
    assert "CartesianProduct" not in plan
    opt = df._jdf.queryExecution().optimizedPlan().toString()
    win_lines = [
        line for line in opt.splitlines() if "windowspecdefinition" in line.lower()
    ]
    assert win_lines, opt  # the caps must survive optimization
    for line in win_lines:
        # every cap window carries a partition key column
        assert ("w#" in line) or ("s#" in line) or ("d#" in line), line
