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

    def _alloc_base(self, label: str, n: int) -> tuple[int, int]:
        """Reserve n entry ids for label -> (label_id, first_entry_id)
        (Graph.alloc_entry_ids: per-label sequence with durable
        high-water-mark recovery)."""
        return self.graph.alloc_entry_ids(label, n)

    def _with_rowid(self, df: DataFrame | None) -> tuple[DataFrame, int]:
        """0..n-1 row ids WITHOUT a global single-partition window: one
        count-per-partition job computes offsets, then ids are
        per-partition `offset + local row_number` — a CREATE fed by a
        huge MATCH keeps all partitions working. Returns (df, n_rows);
        the count job replaces the df.count() the id sequences needed
        anyway (label_commands.c:563-583 sequence reservation)."""
        if df is None:
            df = self.spark.range(1).select(F.lit(1).alias("__one"))
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
        else:  # zero input rows: type-stable placeholder, no rows to number
            base = F.lit(0)
        w = Window.partitionBy("__pid").orderBy(F.monotonically_increasing_id())
        df = df.withColumn("__rn", base + F.row_number().over(w) - 1).drop("__pid")
        return df, acc

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
        if "pv" in g.vertices.columns:
            new_rows = new_rows.withColumn("pv", F.try_parse_json("properties"))
        g.vertices = g.vertices.unionByName(new_rows).localCheckpoint(eager=True)
        g.persist()

    def _commit_edges(self, new_rows: DataFrame) -> None:
        g = self.graph
        if "pv" in g.edges.columns:
            new_rows = new_rows.withColumn("pv", F.try_parse_json("properties"))
        g.edges = g.edges.unionByName(new_rows).localCheckpoint(eager=True)
        g.persist()

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
                lid, base = self._alloc_base(label, n_rows)
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
            if scope.kinds[var] == VKIND_VERTEX:
                upd = (
                    g.vertices.join(updates, F.col("id") == F.col("__uid"), "left_outer")
                    .withColumn("properties", F.coalesce(F.col("__uprops"), F.col("properties")))
                    .drop("__uid", "__uprops")
                )
                if "pv" in g.vertices.columns:  # keep the variant in sync
                    upd = upd.withColumn("pv", F.try_parse_json("properties"))
                g.vertices = upd.localCheckpoint(eager=True)
                g.persist()
            else:
                upd = (
                    g.edges.join(updates, F.col("id") == F.col("__uid"), "left_outer")
                    .withColumn("properties", F.coalesce(F.col("__uprops"), F.col("properties")))
                    .drop("__uid", "__uprops")
                )
                if "pv" in g.edges.columns:
                    upd = upd.withColumn("pv", F.try_parse_json("properties"))
                g.edges = upd.localCheckpoint(eager=True)
                g.persist()
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
        if e_ids is not None:
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
                edges = edges.join(
                    v_ids,
                    (edges["start_id"] == v_ids["id"]) | (edges["end_id"] == v_ids["id"]),
                    "left_anti",
                )
            g.vertices = g.vertices.join(v_ids, g.vertices["id"] == v_ids["id"], "left_anti").localCheckpoint(
                eager=True
            )
        g.edges = edges.localCheckpoint(eager=True)
        g.persist()

    # -------------------------------------------------------------- MERGE

    def do_merge(self, c: A.MergeClause, df, scope: Scope):
        """Two-phase match-or-create (cypher_merge.c:199-430): probe via a
        correlated left-outer join; create the distinct missing keys once
        (created entities are visible to subsequent probe rows, check_path
        cypher_merge.c:199-246 — distinct-key creation reproduces that);
        bind matched-or-created entities into the pipeline."""
        scope = scope.copy()
        els = c.path.elements
        if df is None:
            df = self.spark.range(1).select(F.lit(1).alias("__one"))
        if len(els) == 1:
            return self._merge_single_node(els[0], df, scope)
        if len(els) == 3:
            return self._merge_edge(els[0], els[1], els[2], df, scope)
        raise CompileError("MERGE supports a single node or a single relationship pattern")

    def _merge_single_node(self, node: A.NodePat, df: DataFrame, scope: Scope):
        """Probe is an EQUI join on canonical key text (G.canon_key_text):
        hash/broadcast join, never a nested-loop over gval conditions —
        the only probe shape that survives a 100 TB vertex table."""
        var = node.var or self._fresh("mv")
        label = node.label or DEFAULT_VLABEL
        keys = list(node.props.items.items()) if node.props else []

        # df side: __k{i} = JSON text (for the created props); __ck{i} =
        # canonical join key (null key -> sentinel: matches no probe row
        # but re-joins this statement's own created rows)
        df = df.withColumn("__kc", F.lit(1))
        json_cols, canon_cols = [], []
        for i, (k, vexpr) in enumerate(keys):
            val = self.comp.compile_expr(vexpr, df, scope)
            df = df.withColumn(f"__k{i}", F.coalesce(G.to_json_text(val), F.lit("null")))
            df = df.withColumn(f"__ck{i}", G.canon_key_text(val, null_as_sentinel=True))
            json_cols.append(f"__k{i}")
            canon_cols.append(f"__ck{i}")

        vt = self.graph.vertices_with_label(node.label if node.label else None)
        vpv = F.col("pv") if "pv" in vt.columns else F.try_parse_json("properties")
        probe = vt.select(
            F.struct("id", "label", "properties").alias("__m"),
            F.lit(1).alias("__pkc"),
            *[
                G.canon_key_text(G.prop_access_variant(vpv, [k])).alias(f"__p{i}")
                for i, (k, _) in enumerate(keys)
            ],
        )
        cond = F.col("__kc") == F.col("__pkc")
        for i in range(len(keys)):
            cond = cond & (F.col(f"__ck{i}") == F.col(f"__p{i}"))
        joined = df.join(probe, cond, "left_outer").drop(
            "__pkc", *[f"__p{i}" for i in range(len(keys))]
        )

        # one create per distinct canonical key (first-seen JSON text);
        # created entities are visible to every probe row (check_path,
        # cypher_merge.c:199-246)
        misses = (
            joined.filter(F.col("__m").isNull())
            .groupBy("__kc", *canon_cols)
            .agg(*[F.first(c).alias(c) for c in json_cols])
            if keys
            else joined.filter(F.col("__m").isNull()).select("__kc").distinct()
        )
        misses, n_miss = self._with_rowid(misses)
        if n_miss:
            lid, base = self._alloc_base(label, n_miss)
            gid = F.lit(lid << ENTRY_ID_BITS).cast("long") + F.lit(base) + F.col("__rn")
            if keys:
                parts = [
                    F.concat(F.lit(json.dumps(k)), F.lit(":"), F.col(f"__k{i}"))
                    for i, (k, _) in enumerate(keys)
                ]
                props = F.concat(F.lit("{"), F.concat_ws(",", *parts), F.lit("}"))
            else:
                props = F.lit("{}")
            created = misses.select(
                gid.alias("id"), F.lit(label).alias("label"), props.alias("properties"), "__kc", *canon_cols
            ).localCheckpoint(eager=True)
            self._commit_vertices(created.select("id", "label", "properties"))
            created_structs = created.select(
                F.struct("id", "label", "properties").alias("__c"),
                F.col("__kc").alias("__c__kc"),
                *[F.col(c).alias(f"__c_{c}") for c in canon_cols],
            )
            # pure equi join-back; matched rows also join but coalesce
            # below prefers __m, so only miss rows bind the created entity
            ccond = F.col("__kc") == F.col("__c__kc")
            for c in canon_cols:
                ccond = ccond & (F.col(c) == F.col(f"__c_{c}"))
            joined = joined.join(created_structs, ccond, "left_outer").drop(
                "__c__kc", *[f"__c_{c}" for c in canon_cols]
            )
        else:
            joined = joined.withColumn("__c", F.lit(None).cast("struct<id:bigint,label:string,properties:string>"))

        out = joined.withColumn(var, F.coalesce(F.col("__m"), F.col("__c")))
        drop = ["__m", "__c", "__one", "__kc", *json_cols, *canon_cols]
        out = out.drop(*[d for d in drop if d in out.columns])
        scope.kinds[var] = VKIND_VERTEX
        return out.localCheckpoint(eager=True), scope

    def _merge_edge(self, n0: A.NodePat, rel: A.RelPat, n1: A.NodePat, df: DataFrame, scope: Scope):
        if not (n0.var and n0.var in scope.kinds and n1.var and n1.var in scope.kinds):
            raise CompileError("MERGE relationship requires both endpoints bound")
        if rel.direction == "both":
            raise CompileError("MERGE requires a directed relationship")
        a, b = (n1.var, n0.var) if rel.direction == "in" else (n0.var, n1.var)
        evar = rel.var or self._fresh("me")
        label = rel.label or DEFAULT_ELABEL
        keys = list(rel.props.items.items()) if rel.props else []

        # equi probe: endpoint ids + canonical key text (hash join — the
        # edge table at 100 TB shuffles on (start,end,keys), no BNLJ)
        json_cols, canon_cols = [], []
        for i, (k, vexpr) in enumerate(keys):
            val = self.comp.compile_expr(vexpr, df, scope)
            df = df.withColumn(f"__k{i}", F.coalesce(G.to_json_text(val), F.lit("null")))
            df = df.withColumn(f"__ck{i}", G.canon_key_text(val, null_as_sentinel=True))
            json_cols.append(f"__k{i}")
            canon_cols.append(f"__ck{i}")

        et = self.graph.edges_with_label(rel.label if rel.label else None)
        epv = F.col("pv") if "pv" in et.columns else F.try_parse_json("properties")
        probe = et.select(
            F.struct("id", "start_id", "end_id", "label", "properties").alias("__m"),
            *[
                G.canon_key_text(G.prop_access_variant(epv, [k])).alias(f"__p{i}")
                for i, (k, _) in enumerate(keys)
            ],
        )
        cond = (F.col("__m")["start_id"] == F.col(a)["id"]) & (
            F.col("__m")["end_id"] == F.col(b)["id"]
        )
        for i in range(len(keys)):
            cond = cond & (F.col(f"__ck{i}") == F.col(f"__p{i}"))
        joined = df.join(probe, cond, "left_outer").drop(*[f"__p{i}" for i in range(len(keys))])

        miss_rows = joined.filter(F.col("__m").isNull())
        if keys:
            misses = miss_rows.groupBy(
                F.col(a)["id"].alias("__ms"), F.col(b)["id"].alias("__md"), *canon_cols
            ).agg(*[F.first(c).alias(c) for c in json_cols])
        else:
            misses = miss_rows.select(
                F.col(a)["id"].alias("__ms"), F.col(b)["id"].alias("__md")
            ).distinct()
        misses, n_miss = self._with_rowid(misses)
        if n_miss:
            lid, base = self._alloc_base(label, n_miss)
            gid = F.lit(lid << ENTRY_ID_BITS).cast("long") + F.lit(base) + F.col("__rn")
            if keys:
                parts = [
                    F.concat(F.lit(json.dumps(k)), F.lit(":"), F.col(f"__k{i}"))
                    for i, (k, _) in enumerate(keys)
                ]
                props = F.concat(F.lit("{"), F.concat_ws(",", *parts), F.lit("}"))
            else:
                props = F.lit("{}")
            created = misses.select(
                gid.alias("id"),
                F.col("__ms").alias("start_id"),
                F.col("__md").alias("end_id"),
                F.lit(label).alias("label"),
                props.alias("properties"),
                *canon_cols,
            ).localCheckpoint(eager=True)
            self._commit_edges(created.select("id", "start_id", "end_id", "label", "properties"))
            cstruct = created.select(
                F.struct("id", "start_id", "end_id", "label", "properties").alias("__c"),
                *[F.col(c).alias(f"__c_{c}") for c in canon_cols],
            )
            # pure equi join-back on endpoints + canon keys; coalesce
            # below prefers __m for rows that already matched
            ccond = (F.col("__c")["start_id"] == F.col(a)["id"]) & (
                F.col("__c")["end_id"] == F.col(b)["id"]
            )
            for c in canon_cols:
                ccond = ccond & (F.col(c) == F.col(f"__c_{c}"))
            joined = joined.join(cstruct, ccond, "left_outer").drop(
                *[f"__c_{c}" for c in canon_cols]
            )
        else:
            joined = joined.withColumn(
                "__c",
                F.lit(None).cast(
                    "struct<id:bigint,start_id:bigint,end_id:bigint,label:string,properties:string>"
                ),
            )
        out = joined.withColumn(evar, F.coalesce(F.col("__m"), F.col("__c")))
        drop = ["__m", "__c", "__one", *json_cols, *canon_cols]
        out = out.drop(*[d for d in drop if d in out.columns])
        scope.kinds[evar] = VKIND_EDGE
        return out.localCheckpoint(eager=True), scope
