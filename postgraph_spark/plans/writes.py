"""Cypher write clauses: CREATE / SET / REMOVE / DELETE / MERGE.

The reference executes writes as CustomScan nodes pulling from the child
plan (cypher_create.c:103-571, cypher_set.c:100-188, cypher_delete.c:246-480,
cypher_merge.c:199-430): each matched row drives an insert/update/delete
against the label heap tables, and the written entities remain visible to
later clauses of the same statement.

Spark design: the clause pipeline stays a DataFrame; a write clause
  1. computes the new/updated/deleted entity rows AS COLUMNS of the pipeline
     DataFrame (so later clauses including RETURN see the post-write state),
  2. applies the delta to the graph's backing tables as a distributed
     union / join-update / anti-join (the in-memory analog of Delta
     append / MERGE INTO / DELETE — swap `_commit_*` for Delta ops in a
     lakehouse deployment),
  3. `localCheckpoint`s the pipeline so allocated ids are stable (lineage
     replay must not re-allocate).

Id allocation mirrors the per-label sequences (label_commands.c:563-583):
a base entry-id is reserved per statement and per-row ids are
`base + row_number` — one narrow window over the statement's rows, not a
driver-side loop.
"""

from __future__ import annotations

import json

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from postgraph_spark.functions import gtype as G
from postgraph_spark.graph import ENTRY_ID_BITS, EDGE_SCHEMA, VERTEX_SCHEMA, Graph
from postgraph_spark.plans import ast as A
from postgraph_spark.plans.compiler import (
    Compiler,
    CompileError,
    Scope,
    VKIND_EDGE,
    VKIND_VERTEX,
)

DEFAULT_VLABEL = "_ag_label_vertex"
DEFAULT_ELABEL = "_ag_label_edge"


def _json_set(props: Column, key: str, value_json: Column) -> Column:
    """props JSON with key set — pure JVM map<string,variant> surgery
    (SET to NULL removes the key, cypher_set.c tuple update semantics).
    An existing key is replaced in place (order preserved); a new key
    appends — exactly the dict-update order the reference's tuple
    rewrite produces."""
    m = F.from_json(F.coalesce(props, F.lit("{}")), "map<string,variant>")
    k = F.lit(key)
    has = F.array_contains(F.map_keys(m), k)
    newv = F.try_parse_json(value_json)
    replaced = F.transform_values(
        m, lambda k0, v: F.when((k0 == k) & value_json.isNotNull(), newv).otherwise(v)
    )
    removed = F.map_filter(replaced, lambda k0, v: (k0 != k) | value_json.isNotNull())
    appended = F.when(
        ~has & value_json.isNotNull(), F.map_concat(removed, F.create_map(k, newv))
    ).otherwise(removed)
    return F.to_json(appended)


def _json_merge(props: Column, delta_json: Column) -> Column:
    """`SET n += map`: key-wise merge, null values remove (gtype object
    concat semantics, last-wins de-dup, gtype.h:247-263) — JVM-side."""
    m = F.from_json(F.coalesce(props, F.lit("{}")), "map<string,variant>")
    dm = F.from_json(F.coalesce(delta_json, F.lit("{}")), "map<string,variant>")
    null_keys = F.map_keys(F.map_filter(dm, lambda k, v: F.is_variant_null(v)))
    set_m = F.map_filter(dm, lambda k, v: ~F.is_variant_null(v))
    # replace in place, drop delta-null keys, append delta-new keys
    replaced = F.transform_values(m, lambda k, v: F.coalesce(F.element_at(set_m, k), v))
    removed = F.map_filter(replaced, lambda k, v: ~F.array_contains(null_keys, k))
    new_keys = F.filter(
        F.map_keys(set_m), lambda k: ~F.array_contains(F.map_keys(m), k)
    )
    appended = F.map_concat(
        removed,
        F.map_from_arrays(new_keys, F.transform(new_keys, lambda k: F.element_at(set_m, k))),
    )
    return F.to_json(appended)


def with_rowid(df: DataFrame) -> tuple[DataFrame, int]:
    """0..n-1 row ids WITHOUT a global single-partition window: one
    count-per-partition job computes offsets, then ids are
    per-partition `offset + local row_number` — a CREATE or bulk load
    fed by a huge scan keeps all partitions working. Returns
    (df, n_rows); the count job replaces the df.count() the id
    sequences needed anyway (label_commands.c:563-583 sequence
    reservation). Shared by WriteRunner (CREATE/MERGE) and the bulk
    loader (sources/loader.py)."""
    if "__rn" in df.columns:
        df = df.drop("__rn")
    df = df.withColumn("__pid", F.spark_partition_id())
    counts = {r["__pid"]: r["count"] for r in df.groupBy("__pid").count().collect()}
    off, acc = {}, 0
    for pid in sorted(counts):
        off[pid] = acc
        acc += counts[pid]
    if off:
        mapping = F.create_map(*[F.lit(x) for kv in sorted(off.items()) for x in kv])
        base = mapping[F.col("__pid")]
        # if the plan re-executes with different partitioning (AQE
        # coalescing, nondeterministic upstream), a pid missing from
        # the map must FAIL the statement, not commit null ids:
        # assert_true returns NULL when the check passes, raises when
        # it does not, so the coalesce is a pass-through guard
        base = F.coalesce(F.assert_true(base.isNotNull()).cast("long"), base)
    else:  # zero input rows: type-stable placeholder, no rows to number
        base = F.lit(0)
    w = Window.partitionBy("__pid").orderBy(F.monotonically_increasing_id())
    df = df.withColumn("__rn", base + F.row_number().over(w) - 1).drop("__pid")
    return df, acc


def is_write_clause(c) -> bool:
    return isinstance(c, (A.CreateClause, A.SetClause, A.DeleteClause, A.MergeClause))


class WriteRunner:
    """Executes a SingleQuery that contains write clauses."""

    def __init__(self, spark: SparkSession, graph: Graph):
        self.spark = spark
        self.graph = graph
        self.comp = Compiler(spark, graph)
        self._anon = 0

    # ------------------------------------------------------------- driver

    def run(self, q: A.SingleQuery) -> DataFrame | None:
        # writes can store any type into any property: the static
        # property-type catalog dies before the first clause compiles
        self.graph.invalidate_prop_types()
        df: DataFrame | None = None
        scope = Scope()
        result: DataFrame | None = None
        for clause in q.clauses:
            if isinstance(clause, A.CreateClause):
                df, scope = self.do_create(clause, df, scope)
            elif isinstance(clause, A.SetClause):
                df = self.do_set(clause, df, scope)
            elif isinstance(clause, A.DeleteClause):
                self.do_delete(clause, df, scope)
            elif isinstance(clause, A.MergeClause):
                df, scope = self.do_merge(clause, df, scope)
            elif isinstance(clause, A.ReturnClause):
                result, scope = self.comp.compile_projection(clause, df, scope)
            else:
                df, scope = self.comp.compile_clause(clause, df, scope)
        return result

    # ------------------------------------------------------------ helpers

    def _fresh(self, prefix: str) -> str:
        self._anon += 1
        return f"__{prefix}{self._anon}"

    def _alloc_base(self, label: str, n: int, kind: str = "vertex") -> tuple[int, int]:
        """Reserve n entry ids for label -> (label_id, first_entry_id)
        (Graph.alloc_entry_ids: per-label sequence with durable
        high-water-mark recovery; a DDL-declared label kind is
        enforced)."""
        return self.graph.alloc_entry_ids(label, n, kind)

    def _with_rowid(self, df: DataFrame | None) -> tuple[DataFrame, int]:
        if df is None:
            df = self.spark.range(1).select(F.lit(1).alias("__one"))
        return with_rowid(df)

    def _props_json_col(self, props: A.MapLit | None, df, scope) -> Column:
        if props is None or not props.items:
            return F.lit("{}")
        parts = []
        for k, vexpr in props.items.items():
            val = self.comp.compile_expr(vexpr, df, scope)
            parts.append(
                F.concat(
                    F.lit(json.dumps(k)),
                    F.lit(":"),
                    F.coalesce(G.to_json_text(val), F.lit("null")),
                )
            )
        return F.concat(F.lit("{"), F.concat_ws(",", *parts), F.lit("}"))

    def _commit_vertices(self, new_rows: DataFrame) -> None:
        g = self.graph
        g.enforce_unique("vertices", new_rows)
        if "pv" in g.vertices.columns:
            new_rows = new_rows.withColumn("pv", F.try_parse_json("properties"))
        g.vertices = g.vertices.unionByName(new_rows).localCheckpoint(eager=True)
        # durable path: append only the created rows (O(rows), not
        # O(table) — the created rows were pinned by do_create's
        # checkpoint, so this re-reads memory, not the backing files)
        g.persist_append("vertices", new_rows)

    def _commit_edges(self, new_rows: DataFrame) -> None:
        g = self.graph
        g.enforce_unique("edges", new_rows)
        if "pv" in g.edges.columns:
            new_rows = new_rows.withColumn("pv", F.try_parse_json("properties"))
        g.edges = g.edges.unionByName(new_rows).localCheckpoint(eager=True)
        g.persist_append("edges", new_rows)

    # ------------------------------------------------------------- CREATE

    def do_create(self, c: A.CreateClause, df, scope: Scope):
        """Row-wise CREATE: every input row creates the pattern's unbound
        entities (cypher_create.c:332-540 create_vertex_1/create_edge_1)."""
        scope = scope.copy()
        df, n_rows = self._with_rowid(df)
        created_v: list[str] = []
        created_e: list[str] = []

        def bind_node(node: A.NodePat) -> str:
            nonlocal df
            if node.var and node.var in scope.kinds:
                if scope.kinds[node.var] != VKIND_VERTEX:
                    raise CompileError(f"{node.var!r} is not a vertex")
                return node.var
            label = node.label or DEFAULT_VLABEL
            lid, base = self._alloc_base(label, n_rows)
            gid = F.lit(lid << ENTRY_ID_BITS).cast("long") + F.lit(base) + F.col("__rn")
            var = node.var or self._fresh("cv")
            df = df.withColumn(
                var,
                F.struct(
                    gid.alias("id"),
                    F.lit(label).alias("label"),
                    self._props_json_col(node.props, df, scope).alias("properties"),
                ),
            )
            scope.kinds[var] = VKIND_VERTEX
            created_v.append(var)
            return var

        for path in c.paths:
            els = path.elements
            prev = bind_node(els[0])
            i = 1
            while i < len(els):
                rel: A.RelPat = els[i]
                nxt = bind_node(els[i + 1])
                i += 2
                if rel.direction == "both":
                    raise CompileError("CREATE requires a directed relationship")
                src, dst = (nxt, prev) if rel.direction == "in" else (prev, nxt)
                label = rel.label or DEFAULT_ELABEL
                lid, base = self._alloc_base(label, n_rows, kind="edge")
                gid = F.lit(lid << ENTRY_ID_BITS).cast("long") + F.lit(base) + F.col("__rn")
                evar = rel.var or self._fresh("ce")
                df = df.withColumn(
                    evar,
                    F.struct(
                        gid.alias("id"),
                        F.col(src)["id"].alias("start_id"),
                        F.col(dst)["id"].alias("end_id"),
                        F.lit(label).alias("label"),
                        self._props_json_col(rel.props, df, scope).alias("properties"),
                    ),
                )
                scope.kinds[evar] = VKIND_EDGE
                created_e.append(evar)
                prev = nxt

        df = df.localCheckpoint(eager=True)  # pin allocated ids
        if created_v:
            rows = None
            for var in created_v:
                sel = df.select(
                    F.col(var)["id"].alias("id"),
                    F.col(var)["label"].alias("label"),
                    F.col(var)["properties"].alias("properties"),
                )
                rows = sel if rows is None else rows.unionByName(sel)
            self._commit_vertices(rows)
        if created_e:
            rows = None
            for var in created_e:
                sel = df.select(
                    F.col(var)["id"].alias("id"),
                    F.col(var)["start_id"].alias("start_id"),
                    F.col(var)["end_id"].alias("end_id"),
                    F.col(var)["label"].alias("label"),
                    F.col(var)["properties"].alias("properties"),
                )
                rows = sel if rows is None else rows.unionByName(sel)
            self._commit_edges(rows)
        df = df.drop("__rn", "__one")
        # anonymous entities drop out of the visible scope
        for var in created_v + created_e:
            if var.startswith("__"):
                df = df.drop(var)
                scope.kinds.pop(var, None)
        return df, scope

    # ---------------------------------------------------------------- SET

    def do_set(self, c: A.SetClause, df, scope: Scope) -> DataFrame:
        if df is None:
            raise CompileError("SET requires a preceding MATCH/CREATE")
        touched: dict[str, Column] = {}
        for item in c.items:
            tgt = item.target
            if isinstance(tgt, A.Prop) and isinstance(tgt.base, A.Var) and len(tgt.path) == 1:
                var, key = tgt.base.name, tgt.path[0]
                props = touched.get(var, F.col(var)["properties"])
                val = self.comp.compile_expr(item.expr, df, scope)
                vtext = F.when(val["t"] == G.T_NULL, F.lit(None).cast("string")).otherwise(
                    G.to_json_text(val)
                )
                touched[var] = _json_set(props, key, vtext)
            elif isinstance(tgt, A.Var) and item.is_add:
                var = tgt.name
                props = touched.get(var, F.col(var)["properties"])
                delta = self.comp.compile_expr(item.expr, df, scope)
                touched[var] = _json_merge(props, delta["j"])
            else:
                raise CompileError("SET target must be var.prop or var += map")
        for var, props_col in touched.items():
            kind = scope.kinds.get(var)
            if kind == VKIND_VERTEX:
                new_struct = F.struct(
                    F.col(var)["id"].alias("id"),
                    F.col(var)["label"].alias("label"),
                    props_col.alias("properties"),
                )
            elif kind == VKIND_EDGE:
                new_struct = F.struct(
                    F.col(var)["id"].alias("id"),
                    F.col(var)["start_id"].alias("start_id"),
                    F.col(var)["end_id"].alias("end_id"),
                    F.col(var)["label"].alias("label"),
                    props_col.alias("properties"),
                )
            else:
                raise CompileError(f"cannot SET on {var!r}")
            df = df.withColumn(var, new_struct)
        df = df.localCheckpoint(eager=True)

        g = self.graph
        for var in touched:
            updates = (
                df.select(F.col(var)["id"].alias("__uid"), F.col(var)["properties"].alias("__uprops"))
                .groupBy("__uid")
                .agg(F.last("__uprops").alias("__uprops"))
            )
            # touched label partitions for the durable partition-scoped
            # rewrite (small distinct over the statement's rows)
            upd_labels = [
                r[0] for r in df.select(F.col(var)["label"]).distinct().collect()
            ]
            if scope.kinds[var] == VKIND_VERTEX:
                upd = (
                    g.vertices.join(updates, F.col("id") == F.col("__uid"), "left_outer")
                    .withColumn("properties", F.coalesce(F.col("__uprops"), F.col("properties")))
                    .drop("__uid", "__uprops")
                )
                if "pv" in g.vertices.columns:  # keep the variant in sync
                    upd = upd.withColumn("pv", F.try_parse_json("properties"))
                g.enforce_unique_post_update(upd, upd_labels)
                g.vertices = upd.localCheckpoint(eager=True)
                g.persist_partitions("vertices", upd_labels)
            else:
                upd = (
                    g.edges.join(updates, F.col("id") == F.col("__uid"), "left_outer")
                    .withColumn("properties", F.coalesce(F.col("__uprops"), F.col("properties")))
                    .drop("__uid", "__uprops")
                )
                if "pv" in g.edges.columns:
                    upd = upd.withColumn("pv", F.try_parse_json("properties"))
                g.enforce_unique_post_update(upd, upd_labels)
                g.edges = upd.localCheckpoint(eager=True)
                g.persist_partitions("edges", upd_labels)
        return df

    # ------------------------------------------------------------- DELETE

    def do_delete(self, c: A.DeleteClause, df, scope: Scope) -> None:
        if df is None:
            raise CompileError("DELETE requires a preceding MATCH")
        g = self.graph
        v_ids: DataFrame | None = None
        e_ids: DataFrame | None = None
        for e in c.exprs:
            if not isinstance(e, A.Var):
                raise CompileError("DELETE takes entity variables")
            kind = scope.kinds.get(e.name)
            ids = df.select(F.col(e.name)["id"].alias("id")).distinct()
            if kind == VKIND_VERTEX:
                v_ids = ids if v_ids is None else v_ids.union(ids).distinct()
            elif kind == VKIND_EDGE:
                e_ids = ids if e_ids is None else e_ids.union(ids).distinct()
            else:
                raise CompileError(f"cannot DELETE {e.name!r}")

        edges = g.edges
        # touched label partitions (durable path only): collected from
        # the DELETED rows so the backing-store rewrite stays partition-
        # scoped (persist_partitions) instead of a full-table flush
        e_label_dfs = []
        v_labels: list[str] = []
        if e_ids is not None:
            if g.durable_path:
                e_label_dfs.append(
                    edges.join(e_ids, edges["id"] == e_ids["id"], "left_semi").select("label")
                )
            edges = edges.join(e_ids, edges["id"] == e_ids["id"], "left_anti")
        if v_ids is not None:
            incident = edges.join(
                v_ids,
                (edges["start_id"] == v_ids["id"]) | (edges["end_id"] == v_ids["id"]),
                "left_semi",
            )
            if not c.detach:
                # error when non-deleted edges remain attached
                # (find_connected_edges, cypher_delete.c:405-480)
                if incident.limit(1).count() > 0:
                    raise ValueError("Cannot delete a vertex that still has edges (use DETACH DELETE)")
            else:
                if g.durable_path:
                    e_label_dfs.append(incident.select("label"))
                edges = edges.join(
                    v_ids,
                    (edges["start_id"] == v_ids["id"]) | (edges["end_id"] == v_ids["id"]),
                    "left_anti",
                )
            if g.durable_path:
                v_labels = [
                    r[0]
                    for r in g.vertices.join(
                        v_ids, g.vertices["id"] == v_ids["id"], "left_semi"
                    ).select("label").distinct().collect()
                ]
            g.vertices = g.vertices.join(v_ids, g.vertices["id"] == v_ids["id"], "left_anti").localCheckpoint(
                eager=True
            )
        g.edges = edges.localCheckpoint(eager=True)
        if g.durable_path:
            e_labels: set[str] = set()
            for ldf in e_label_dfs:
                e_labels.update(r[0] for r in ldf.distinct().collect())
            g.persist_partitions("vertices", v_labels)
            g.persist_partitions("edges", sorted(e_labels))

    # -------------------------------------------------------------- MERGE
    def do_merge(self, c: A.MergeClause, df, scope: Scope):
        """Full-path match-or-create (cypher_merge.c:199-430): the WHOLE
        pattern either matches (every match binds a row) or is created —
        including multi-hop paths and unbound endpoints
        (old/regress/cypher_merge.sql tests 8-13). Probe is an equi
        left-outer join of the pipeline against the standalone-compiled
        pattern, correlated on outer-bound vertex ids plus canonical key
        text of correlated property expressions ({i: n.i} — test 3);
        misses create ALL unbound entities once per distinct correlation
        key, so created paths are visible to every probe row."""
        scope = scope.copy()
        els = c.path.elements
        if df is None:
            df = self.spark.range(1).select(F.lit(1).alias("__one"))

        def free_vars(e, out):
            if isinstance(e, A.Var):
                out.add(e.name)
            elif isinstance(e, A.Prop):
                free_vars(e.base, out)
            elif isinstance(e, A.BinOp):
                free_vars(e.left, out)
                free_vars(e.right, out)
            elif isinstance(e, (A.UnaryOp, A.IsNull, A.BoolTest)):
                free_vars(e.operand, out)
            elif isinstance(e, A.DistinctFrom):
                free_vars(e.left, out)
                free_vars(e.right, out)
            elif isinstance(e, A.Cast):
                free_vars(e.operand, out)
            elif isinstance(e, A.FuncCall):
                for a in e.args:
                    free_vars(a, out)
            elif isinstance(e, (A.Index, A.Slice)):
                free_vars(e.base, out)
            return out

        # ---- classify elements; split props into pattern-const vs
        # correlated-with-outer-scope
        elems = []  # (kind, var, bound, el, const_props, corr_items)
        for i, el in enumerate(els):
            if i % 2 == 0:
                var = el.var or self._fresh("mn")
                bound = bool(el.var) and scope.kinds.get(el.var) == VKIND_VERTEX
            else:
                if el.direction == "both":
                    raise CompileError("MERGE requires a directed relationship")
                if el.var and el.var in scope.kinds:
                    raise CompileError(f"MERGE cannot reuse bound relationship {el.var!r}")
                if el.varlen is not None:
                    raise CompileError("MERGE does not support variable-length patterns")
                var = el.var or self._fresh("me")
                bound = False
            const_items, corr_items = {}, []
            if el.props:
                for k, vexpr in el.props.items.items():
                    fv = free_vars(vexpr, set())
                    if any(v in scope.kinds for v in fv):
                        corr_items.append((k, vexpr))
                    else:
                        const_items[k] = vexpr
            elems.append(("v" if i % 2 == 0 else "e", var, bound, el, const_items, corr_items))

        # ---- standalone pattern compile (const props only)
        pattern_els = []
        for kind, var, bound, el, const_items, corr_items in elems:
            cp = A.MapLit(dict(const_items)) if const_items else None
            if kind == "v":
                pattern_els.append(A.NodePat(var, el.label, cp))
            else:
                pattern_els.append(A.RelPat(var, el.label, cp, el.direction, None))
        sub = Compiler(self.spark, self.graph)
        pdf, _ps = sub.compile_match(
            A.MatchClause([A.Path(None, pattern_els)], None, False, []), None, Scope()
        )
        for kind, var, *_rest in elems:
            pdf = pdf.withColumnRenamed(var, f"__pm_{var}")

        # ---- correlated prop key columns on both sides
        corr_list = []  # (tag, elem_idx, key, expr)
        for idx, (kind, var, bound, el, const_items, corr_items) in enumerate(elems):
            for k, vexpr in corr_items:
                corr_list.append((f"{idx}_{k}", idx, k, vexpr))
        for tag, idx, k, vexpr in corr_list:
            kind, var = elems[idx][0], elems[idx][1]
            pmv = F.col(f"__pm_{var}")
            ppv = pmv["pv"]
            pdf = pdf.withColumn(
                f"__pc_{tag}", G.canon_key_text(G.from_variant(F.try_variant_get(ppv, f"$.{k}", "variant")))
            )
        oc_cols, oj_cols = [], []
        for tag, idx, k, vexpr in corr_list:
            val = self.comp.compile_expr(vexpr, df, scope)
            df = df.withColumn(f"__oc_{tag}", G.canon_key_text(val, null_as_sentinel=True))
            df = df.withColumn(f"__oj_{tag}", F.coalesce(G.to_json_text(val), F.lit("null")))
            oc_cols.append(f"__oc_{tag}")
            oj_cols.append(f"__oj_{tag}")

        # ---- probe join: bound ids + correlated prop keys (pure equi)
        bound_vars = [var for kind, var, bound, *_ in elems if bound]
        cond = F.lit(True)
        for var in dict.fromkeys(bound_vars):
            cond = cond & (F.col(var)["id"] == F.col(f"__pm_{var}")["id"])
        for tag, *_ in [(t,) for t, *_r in corr_list]:
            cond = cond & (F.col(f"__oc_{tag}") == F.col(f"__pc_{tag}"))
        joined = df.join(pdf, cond, "left_outer").drop(
            *[f"__pc_{t}" for t, *_r in corr_list]
        )
        first_unmatched = elems[0][1]
        matched = F.col(f"__pm_{first_unmatched}").isNotNull()

        # ---- create whole path for distinct miss keys
        key_cols = [F.col(v)["id"].alias(f"__bk_{v}") for v in dict.fromkeys(bound_vars)]
        key_names = [f"__bk_{v}" for v in dict.fromkeys(bound_vars)] + oc_cols
        miss_rows = joined.filter(~matched)
        if key_cols or oc_cols:
            misses = (
                miss_rows.select(*key_cols, *oc_cols, *oj_cols)
                .groupBy(*key_names)
                .agg(*[F.first(cjs).alias(cjs) for cjs in oj_cols])
                if oj_cols
                else miss_rows.select(*key_cols, *oc_cols).distinct()
            )
        else:
            misses = miss_rows.select(F.lit(1).alias("__mk")).distinct()
            key_names = ["__mk"]
            joined = joined.withColumn("__mk", F.lit(1))
        misses, n_miss = self._with_rowid(misses)

        created_cols: dict[str, Column] = {}
        if n_miss:
            def props_json(idx) -> Column:
                _k, _v, _b, el, const_items, corr_items = elems[idx]
                parts = []
                for k, vexpr in const_items.items():
                    val = self.comp.compile_expr(vexpr, None, Scope())
                    parts.append(
                        F.concat(F.lit(json.dumps(k)), F.lit(":"),
                                 F.coalesce(G.to_json_text(val), F.lit("null")))
                    )
                for k, vexpr in corr_items:
                    tag = f"{idx}_{k}"
                    parts.append(F.concat(F.lit(json.dumps(k)), F.lit(":"), F.col(f"__oj_{tag}")))
                if not parts:
                    return F.lit("{}")
                return F.concat(F.lit("{"), F.concat_ws(",", *parts), F.lit("}"))

            # vertices first (edges need their ids)
            vid_expr: dict[int, Column] = {}
            v_rows = None
            for idx, (kind, var, bound, el, *_r) in enumerate(elems):
                if kind != "v":
                    continue
                if bound:
                    vid_expr[idx] = F.col(f"__bk_{var}")
                    continue
                label = el.label or DEFAULT_VLABEL
                lid, base = self._alloc_base(label, n_miss)
                gid = F.lit(lid << ENTRY_ID_BITS).cast("long") + F.lit(base) + F.col("__rn")
                vid_expr[idx] = gid
                misses = misses.withColumn(f"__cid_{var}", gid)
                vid_expr[idx] = F.col(f"__cid_{var}")
                sel = misses.select(
                    F.col(f"__cid_{var}").alias("id"),
                    F.lit(label).alias("label"),
                    props_json(idx).alias("properties"),
                )
                v_rows = sel if v_rows is None else v_rows.unionByName(sel)
                created_cols[var] = F.struct(
                    F.col(f"__cid_{var}").alias("id"),
                    F.lit(label).alias("label"),
                    props_json(idx).alias("properties"),
                )
            e_rows = None
            for idx, (kind, var, bound, el, *_r) in enumerate(elems):
                if kind != "e":
                    continue
                label = el.label or DEFAULT_ELABEL
                lid, base = self._alloc_base(label, n_miss, kind="edge")
                gid = F.lit(lid << ENTRY_ID_BITS).cast("long") + F.lit(base) + F.col("__rn")
                misses = misses.withColumn(f"__cid_{var}", gid)
                src_i, dst_i = (idx - 1, idx + 1) if el.direction != "in" else (idx + 1, idx - 1)
                sel = misses.select(
                    F.col(f"__cid_{var}").alias("id"),
                    vid_expr[src_i].alias("start_id"),
                    vid_expr[dst_i].alias("end_id"),
                    F.lit(label).alias("label"),
                    props_json(idx).alias("properties"),
                )
                e_rows = sel if e_rows is None else e_rows.unionByName(sel)
                created_cols[var] = F.struct(
                    F.col(f"__cid_{var}").alias("id"),
                    vid_expr[src_i].alias("start_id"),
                    vid_expr[dst_i].alias("end_id"),
                    F.lit(label).alias("label"),
                    props_json(idx).alias("properties"),
                )
            misses = misses.localCheckpoint(eager=True)  # pin allocated ids
            if v_rows is not None:
                self._commit_vertices(
                    misses.select(
                        F.explode(
                            F.array(*[
                                created_cols[var]
                                for kind, var, bound, *_r in elems
                                if kind == "v" and not bound
                            ])
                        ).alias("__v")
                    ).select("__v.id", "__v.label", "__v.properties")
                )
            if e_rows is not None:
                self._commit_edges(
                    misses.select(
                        F.explode(
                            F.array(*[
                                created_cols[var]
                                for kind, var, bound, *_r in elems
                                if kind == "e"
                            ])
                        ).alias("__e")
                    ).select("__e.id", "__e.start_id", "__e.end_id", "__e.label", "__e.properties")
                )
            # join created entities back to ALL rows on the same keys
            cstructs = misses.select(
                *[F.col(kn) for kn in key_names],
                *[
                    created_cols[var].alias(f"__cr_{var}")
                    for kind, var, bound, *_r in elems
                    if not bound
                ],
            )
            # outer side key name alignment: bound ids live in entity structs
            jcond = F.lit(True)
            for v in dict.fromkeys(bound_vars):
                jcond = jcond & (F.col(v)["id"] == cstructs[f"__bk_{v}"])
            for ocn in oc_cols:
                jcond = jcond & (joined[ocn] == cstructs[ocn])
            if not bound_vars and not oc_cols:
                jcond = joined["__mk"] == cstructs["__mk"]
            joined = joined.join(
                cstructs,
                jcond,
                "left_outer",
            )
            # cstructs carries duplicate key columns — drop its copies
            for kn in key_names:
                joined = joined.drop(cstructs[kn])

        # ---- bind each pattern var: matched struct (pv stripped) else created
        def strip_pv(col: Column, kind: str) -> Column:
            if kind == "v":
                return F.struct(col["id"].alias("id"), col["label"].alias("label"),
                                col["properties"].alias("properties"))
            return F.struct(col["id"].alias("id"), col["start_id"].alias("start_id"),
                            col["end_id"].alias("end_id"), col["label"].alias("label"),
                            col["properties"].alias("properties"))

        out = joined
        for kind, var, bound, el, *_r in elems:
            if bound:
                out = out.drop(f"__pm_{var}")
                continue
            pm = strip_pv(F.col(f"__pm_{var}"), kind)
            if n_miss and f"__cr_{var}" in out.columns:
                bound_col = F.when(F.col(f"__pm_{var}").isNotNull(), pm).otherwise(F.col(f"__cr_{var}"))
            else:
                bound_col = pm
            anonymous = el.var is None
            out = out.withColumn(var, bound_col).drop(f"__pm_{var}", f"__cr_{var}")
            if anonymous:
                out = out.drop(var)
            else:
                scope.kinds[var] = VKIND_VERTEX if kind == "v" else VKIND_EDGE
        drops = [c0 for c0 in out.columns if c0.startswith("__oc_") or c0.startswith("__oj_")
                 or c0 == "__mk" or c0 == "__one" or c0.startswith("__rn")]
        out = out.drop(*drops)
        # pin the pipeline only when this MERGE created entities: the
        # created ids come from the already-checkpointed `misses`, but the
        # surrounding join tree is cheap insurance to pin too. A fully
        # MATCHED merge allocated nothing and committed nothing — its
        # output is a deterministic function of stable inputs, so the
        # eager checkpoint would only add a no-op materialization job
        # (measured ~1.2 s per no-op MERGE at sf0.01).
        return (out.localCheckpoint(eager=True) if n_miss else out), scope
