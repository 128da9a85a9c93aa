"""Whole-graph analytics: PageRank and triangle counting as DataFrame
iterations — the GraphX-style algorithms expressed Spark-first (joins +
aggregations with per-round lineage cuts, the same pattern as
operators/cc.py and the VLE checkpoint loop).

Scale notes (100 TB):
- Each PageRank round is two shuffles (contribution join on src, sum on
  dst), both on vertex id; AQE handles hub skew. Dangling mass is a
  1-row aggregate redistributed via a broadcast literal, not a
  crossJoin of data.
- Triangle counting orients edges low->high id first, so every triangle
  is counted exactly once and the join fan-out of hub vertices is
  bounded by forward-degree (the standard oriented-wedge optimization).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    num_iter: int = 10,
    damping: float = 0.85,
) -> DataFrame:
    """PageRank over the directed edge list; returns (v, rank) with
    sum(rank) == 1 (dangling mass redistributed uniformly)."""
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    verts = (
        e.select(F.col("src").alias("v"))
        .union(e.select(F.col("dst").alias("v")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = verts.count()
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    # (src, dst, deg) fixed for all rounds — checkpoint once
    ed = e.join(outdeg, "src").localCheckpoint(eager=True)
    ranks = verts.select("v", (F.lit(1.0) / n).alias("rank"))

    for _ in range(num_iter):
        contribs = (
            ed.join(ranks.withColumnRenamed("v", "src"), "src")
            .select(F.col("dst").alias("v"), (F.col("rank") / F.col("deg")).alias("c"))
            .groupBy("v")
            .agg(F.sum("c").alias("c"))
        )
        # dangling vertices (no out-edges) leak their rank: collect the
        # leaked mass as ONE driver-side double and fold it into the
        # uniform term
        dangling = (
            ranks.join(outdeg.withColumnRenamed("src", "v"), "v", "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)))
            .first()[0]
        )
        base = (1.0 - damping) / n + damping * dangling / n
        ranks = (
            verts.join(contribs, "v", "left")
            .select(
                "v",
                (F.lit(base) + F.lit(damping) * F.coalesce(F.col("c"), F.lit(0.0))).alias(
                    "rank"
                ),
            )
            .localCheckpoint(eager=True)
        )
    return ranks


def triangle_count(edges: DataFrame, src: str = "a", dst: str = "b") -> DataFrame:
    """Triangles per vertex in the UNDIRECTED graph given as a pair
    list; returns (v, triangles). Edges are oriented low->high id so
    each triangle (a<b<c) is enumerated exactly once from its lowest
    vertex — the join fan-out on hubs is bounded by forward-degree.

    The oriented distinct pair set feeds THREE join sides (ab, ac, bc);
    the textual plan re-inlines the upstream edge pipeline per side,
    but the distinct's Exchange is deterministic and identical on all
    three, so runtime exchange reuse computes it once (same-host A/B:
    an eager localCheckpoint variant LOST — it forces a separate
    materialization job that exchange reuse gives for free, 1.80 vs
    2.03 s idle). Triangle membership is ONE explode pass over the
    triangle rows instead of a 3-way union whose branches re-computed
    the two wedge joins per branch above the reused exchanges
    (2.81 -> 1.80 s idle, same integers)."""
    und = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .select(
            F.least("u", "v").alias("lo"), F.greatest("u", "v").alias("hi")
        )
        .distinct()
    )
    # wedge (a<b, a<c, b<c) closed by edge (b, c)
    tri = (
        und.alias("ab")
        .join(und.alias("ac"), F.col("ab.lo") == F.col("ac.lo"))
        .filter(F.col("ab.hi") < F.col("ac.hi"))
        .join(
            und.alias("bc"),
            (F.col("bc.lo") == F.col("ab.hi")) & (F.col("bc.hi") == F.col("ac.hi")),
        )
        .select(
            F.col("ab.lo").alias("x"), F.col("ab.hi").alias("y"), F.col("ac.hi").alias("z")
        )
    )
    # same multiset as UNION ALL of x/y/z — one pass, no tri re-read
    member = tri.select(
        F.explode(F.array(F.col("x"), F.col("y"), F.col("z"))).alias("v")
    )
    return member.groupBy("v").agg(F.count(F.lit(1)).alias("triangles"))


def kcore(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    k: int = 2,
    rounds: int = 4,
) -> DataFrame:
    """k-core decomposition by iterative peeling (Seidman 1983; the
    Batagelj-Zaversnik bulk variant): each round removes every vertex
    whose degree in the REMAINING undirected graph is < k, together
    with its edges. A FIXED round count keeps the computation a pure
    function of the edge list (replayable as SQL CTEs); on graphs whose
    peeling converges within `rounds` the result IS the k-core (tests
    assert the fixpoint). Returns (v, core_degree) for surviving
    vertices.

    Scale shape: per round one degree partial-agg + two semi-join-style
    vertex filters, all keyed on vertex id; the edge set only shrinks;
    per-round lineage cut via checkpoint."""
    e = edges.select(F.col(src).alias("s"), F.col(dst).alias("t"))
    und = e.union(
        e.select(F.col("t").alias("s"), F.col("s").alias("t"))
    ).localCheckpoint(eager=True)
    for _ in range(rounds):
        deg = und.groupBy("s").agg(F.count(F.lit(1)).alias("c"))
        keep = deg.filter(F.col("c") >= k).select("s")
        und = (
            und.join(keep, "s")
            .join(keep.withColumnRenamed("s", "t"), "t")
            .select("s", "t")
            .localCheckpoint(eager=True)
        )
    return und.groupBy(F.col("s").alias("v")).agg(
        F.count(F.lit(1)).alias("core_degree")
    )


def hits(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    num_iter: int = 3,
) -> DataFrame:
    """HITS hubs & authorities (Kleinberg 1999) over the directed edge
    list, UNNORMALIZED: hub/auth init to 1; each round auth(v) = sum of
    hub over in-neighbors, then hub(u) = sum of the JUST-updated auth
    over out-neighbors (the classic update order). Skipping the per-round
    scalar normalization keeps every score an exact INTEGER (sums of
    integers — per-round rankings are identical to normalized HITS,
    which only divides by a round-constant), so an oracle replaying the
    rounds matches bit-for-bit with no float-ordering exposure at all.
    Returns (v, hub, auth) as longs.

    Scale shape: two vertex-keyed join+partial-agg shuffles per round
    (the PageRank contribution pattern); the edge list checkpoints once;
    scores checkpoint per round to cut lineage. Values grow like the
    principal eigenvalue^rounds — num_iter stays small (3 here), and at
    int64 that bounds degree^(2*rounds) fan-in, plenty for dup graphs."""
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).localCheckpoint(
        eager=True
    )
    verts = (
        e.select(F.col("src").alias("v"))
        .union(e.select(F.col("dst").alias("v")))
        .distinct()
    )
    # SPARSE rounds (round-11 optimization): a vertex absent from the
    # score table behaves exactly like an explicit 0 — it drops out of
    # the contribution join and contributes nothing to any sum — so the
    # per-round `verts LEFT JOIN + coalesce(0)` densification is deferred
    # to the single final projection. That removes TWO vertex-keyed joins
    # per round, and only ONE lineage cut per round is needed (hub; the
    # round's auth is computed inside the same job — same shuffles,
    # half the driver jobs). Values are bit-identical: integer sums over
    # the same edge multiset, zeros restored at the end.
    hub = verts.select("v", F.lit(1).cast("long").alias("hub"))
    # num_iter=0 degenerates to the init scores (hub = auth = 1), not a
    # crash on joining an unset auth frame
    auth = verts.select("v", F.lit(1).cast("long").alias("auth"))
    for _ in range(num_iter):
        auth = (
            e.join(hub.withColumnRenamed("v", "src"), "src")
            .groupBy(F.col("dst").alias("v"))
            .agg(F.sum("hub").cast("long").alias("auth"))
        )
        hub = (
            e.join(auth.withColumnRenamed("v", "dst"), "dst")
            .groupBy(F.col("src").alias("v"))
            .agg(F.sum("auth").cast("long").alias("hub"))
            .localCheckpoint(eager=True)
        )
    return (
        verts.join(hub, "v", "left")
        .join(auth, "v", "left")
        .select(
            "v",
            F.coalesce("hub", F.lit(0)).cast("long").alias("hub"),
            F.coalesce("auth", F.lit(0)).cast("long").alias("auth"),
        )
    )


def adamic_adar(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_degree: int | None = None,
    distinct_oriented: bool = False,
) -> DataFrame:
    """Adamic-Adar link prediction (Adamic & Adar 2003) over an
    undirected graph: for every NON-adjacent 2-hop pair (a < b),
    AA(a,b) = sum over common neighbors z of 1/log2(deg(z)) — high
    scores predict a missing edge (here: a near-dup pair the LSH
    banding missed). deg(z) >= 2 for any common neighbor in the
    symmetrized graph, so log2(deg) >= 1 and the sum is finite.

    Scale shape: candidate pairs come from ONE 2-hop equi-join on the
    shared neighbor (the triangle/wedge join — skewed hubs are
    AQE-split); the middle vertex's degree rides as a count window in
    the wedge join's own s-keyed exchange (no separate degree shuffle
    or join); direct edges are removed with a left-anti join. Never
    all-pairs.

    ``max_degree`` (round-10 verdict #1): the wedge join's fan per
    middle vertex z is in-degree(z) x out-degree(z) — a hot hub turns
    it quadratic. With the cap set, the adjacency is deterministically
    bounded with guards.cap_per_key applied on BOTH orientations (first
    keep the min-``max_degree`` neighbors d per s, then the
    min-``max_degree`` sources s per d of the survivors), so every
    z contributes at most max_degree^2 wedge rows. Degrees and wedges
    both read the capped adjacency (scores stay consistent); the
    direct-edge anti-join reads the UNCAPPED edge set — a real edge is
    never predicted as missing even if the cap dropped it. The cap is
    the IVF fixed-size-probe-list convention (ivfscan.c) applied to
    graph fan-out; an exact oracle replays it as two row_number CTEs.
    Returns (a, b, aa, common).

    ``distinct_oriented``: promise that ``edges`` is already DISTINCT
    with src < dst on every row. Then the symmetrizing union is a union
    of two disjoint distinct sets (src < dst vs src > dst), so its
    ``distinct()`` — a full shuffle of the pair table, the same byte
    class as the edge set itself — is provably a no-op and is skipped,
    and ``und`` degrades to a pure projection-union of the (caller-
    materialized) input that every consumer re-derives for free, so its
    lineage-cut checkpoint job is skipped too. Output is bit-identical;
    only callers that guarantee the invariant may set it."""
    from postgraph_spark.operators.guards import cap_per_key

    e = edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
    # und feeds TWO consumers (the capped adjacency and the direct-edge
    # anti-join) and adj THREE (degrees + both wedge sides). Without a
    # lineage cut every consumer re-inlines the whole upstream pipeline
    # — the round-11 plan audit measured 106 Exchanges for the
    # adamic_adar_linkpred registration (the edge build + both
    # cap_per_key windows re-executed per consumer) and a 32x time ratio
    # at 10x data. One localCheckpoint each makes the plan compute the
    # symmetrized edge set and the capped adjacency ONCE; row values are
    # untouched. Under distinct_oriented the union IS the distinct
    # symmetric edge set and costs nothing to recompute — no shuffle,
    # no checkpoint.
    if distinct_oriented:
        # enforce the promised orientation map-side (ADVICE r11): under
        # the held invariant `s < d` passes every row (bit-identical,
        # free — no shuffle); a caller that violates it gets its
        # reversed rows EXCLUDED here instead of silently inflating
        # degrees/wedge counts and corrupting the direct-edge anti-join.
        # (Duplicate rows cannot be guarded without the very shuffle
        # this flag exists to skip — still the caller's promise.)
        e = e.filter(F.col("s") < F.col("d"))
    und = e.union(e.select(F.col("d").alias("s"), F.col("s").alias("d")))
    if not distinct_oriented:
        und = und.distinct().localCheckpoint(eager=True)
    adj = und
    if max_degree is not None:
        adj = cap_per_key(adj, ["s"], ["d"], max_degree)
        adj = cap_per_key(adj, ["d"], ["s"], max_degree)
        adj = adj.localCheckpoint(eager=True)
    # The middle vertex's degree dg(z) = count of adj rows with s == z —
    # exactly a count window over the (s)-partitioning the wedge join's
    # RIGHT side must shuffle by anyway, so it rides in that exchange
    # instead of a separate groupBy-s aggregation plus a vertex-keyed
    # degree join (one full shuffle of adj and one SortMergeJoin
    # removed; same integers either way). Per-s partition size is
    # bounded by max_degree when the cap is set, and an uncapped hub's
    # window partition is no larger than the wedge rows that same hub
    # already fans into the join.
    from pyspark.sql import Window

    # window FIRST, rename AFTER: aliasing inside the same select would
    # give the window's partition key and the join key distinct
    # attribute ids, and the planner would re-shuffle between them
    wedge_right = adj.withColumn(
        "dg", F.count(F.lit(1)).over(Window.partitionBy("s"))
    ).select(F.col("s").alias("z"), F.col("d").alias("b"), "dg")
    wedges = (
        adj.select(F.col("s").alias("a"), F.col("d").alias("z"))
        .join(wedge_right, "z")
        .filter(F.col("a") < F.col("b"))
    )
    # dg >= 2 is a tautology on the uncapped symmetric graph (a wedge
    # middle has at least its two endpoints as neighbors); under a
    # binding max_degree the d-side cap can orphan a middle at
    # out-degree 1, where 1/log2(dg) is undefined — filter it
    # explicitly, mirrored in the oracle.
    scored = (
        wedges.filter(F.col("dg") >= 2)
        .groupBy("a", "b")
        .agg(
            F.round(F.sum(1.0 / F.log2("dg")), 6).alias("aa"),
            F.count(F.lit(1)).alias("common"),
        )
    )
    direct = und.filter(F.col("s") < F.col("d")).select(
        F.col("s").alias("a"), F.col("d").alias("b")
    )
    return scored.join(direct, ["a", "b"], "left_anti").select(
        "a", "b", "aa", F.col("common").cast("long").alias("common")
    )


def label_propagation(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    num_iter: int = 4,
) -> DataFrame:
    """Synchronous label-propagation community detection (Raghavan et
    al. 2007, the GraphX LPA variant made DETERMINISTIC): labels init to
    the vertex id; each round every vertex adopts the most frequent
    label among its neighbors, ties broken by the SMALLEST label, all
    vertices updating simultaneously from the previous round's labels.
    A fixed round count + deterministic tie-break means the result is a
    pure function of the edge list — exactly replayable as SQL CTEs by
    the oracle. Returns (v, lbl).

    Scale shape: per round one join of the oriented edge list against
    the label table (both keyed on vertex id) + two partial-agg
    shuffles (neighbor-label counts, per-vertex argmin pick); labels
    checkpoint per round to cut lineage. Isolated vertices keep their
    own label (LEFT join + coalesce)."""
    e = edges.select(F.col(src).alias("s"), F.col(dst).alias("t"))
    und = e.union(
        e.select(F.col("t").alias("s"), F.col("s").alias("t"))
    ).localCheckpoint(eager=True)
    verts = und.select(F.col("s").alias("v")).distinct()
    labels = verts.select("v", F.col("v").alias("lbl")).localCheckpoint(eager=True)
    for _ in range(num_iter):
        cnt = (
            und.join(labels.withColumnRenamed("v", "s"), "s")
            .groupBy(F.col("t").alias("v"), "lbl")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        # argmax count with min-label tie-break == lexicographic min of
        # (-count, label)
        pick = cnt.groupBy("v").agg(
            F.min(F.struct((-F.col("c")).alias("nc"), F.col("lbl")))
            .getField("lbl")
            .alias("new_lbl")
        )
        labels = (
            labels.join(pick, "v", "left")
            .select("v", F.coalesce("new_lbl", "lbl").alias("lbl"))
            .localCheckpoint(eager=True)
        )
    return labels
