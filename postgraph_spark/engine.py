"""CypherEngine — the user-facing query surface.

Statement lifecycle mirrors SURVEY §3: text -> parse (plans.parser) ->
clause IR -> DataFrame compile (plans.compiler) -> Catalyst. Graph DDL
(CREATE/USE/DROP GRAPH — reference graph_commands.c) and data-writing
CREATE are dispatched before the read compiler.
"""

from __future__ import annotations

import json
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from postgraph_spark.functions import gtype as G
from postgraph_spark.graph import Graph, GraphCatalog
from postgraph_spark.plans import ast as A
from postgraph_spark.plans.compiler import Compiler
from postgraph_spark.plans.parser import parse

_DDL_RE = re.compile(
    r"^\s*(CREATE|USE|DROP)\s+GRAPH\s+(IF\s+NOT\s+EXISTS\s+)?([A-Za-z_][A-Za-z_0-9]*)\s*(CASCADE)?\s*;?\s*$",
    re.IGNORECASE,
)

# alter_graph(name, 'RENAME', new) — RENAME is the only operation the
# reference supports (graph_commands.c:380-430)
_ALTER_GRAPH_RE = re.compile(
    r"^\s*ALTER\s+GRAPH\s+([A-Za-z_][A-Za-z_0-9]*)\s+RENAME\s+TO\s+"
    r"([A-Za-z_][A-Za-z_0-9]*)\s*;?\s*$",
    re.IGNORECASE,
)

# label DDL + constraints — the statement surface over the reference's
# SQL functions (sql/postgraph.sql.in:131-171; label_commands.c:170,249,
# 271-350,425-520,976-1040): create_vlabel/create_elabel/drop_label,
# create_unique_properties_constraint, create_property_index
_LABEL_RE = re.compile(
    r"^\s*CREATE\s+(VLABEL|ELABEL)\s+([A-Za-z_][A-Za-z_0-9]*)\s*;?\s*$", re.IGNORECASE
)
_DROP_LABEL_RE = re.compile(
    r"^\s*DROP\s+(?:V|E)?LABEL\s+([A-Za-z_][A-Za-z_0-9]*)(\s+FORCE)?\s*;?\s*$", re.IGNORECASE
)
_UNIQUE_PROPS_RE = re.compile(
    r"^\s*CREATE\s+UNIQUE\s+PROPERTIES\s+CONSTRAINT\s+ON\s+([A-Za-z_][A-Za-z_0-9]*)\s*;?\s*$",
    re.IGNORECASE,
)
# Entry point C (SURVEY §3): any plain-SQL statement falls through to
# the SQL engine — the reference hands these to stock Postgres
# (regress/sql/new_cypher.sql mixes CREATE TABLE / SELECT with Cypher);
# here they run on Spark SQL with the current graph's tables exposed as
# views. Leading-WITH stays Cypher (`WITH 1 AS x RETURN x`); the
# CYPHER prefix forces the Cypher path as in the reference.
_SQL_RE = re.compile(
    r"^\s*(SELECT|VALUES|INSERT|CREATE\s+(?:OR\s+REPLACE\s+)?(?:TEMPORARY\s+)?"
    r"(?:TABLE|VIEW)|DROP\s+(?:TABLE|VIEW)|SHOW|DESCRIBE)\b",
    re.IGNORECASE,
)

_PROP_INDEX_RE = re.compile(
    r"^\s*CREATE\s+(UNIQUE\s+)?PROPERTY\s+INDEX\s+ON\s+([A-Za-z_][A-Za-z_0-9]*)\s*"
    r"\(\s*([A-Za-z_][A-Za-z_0-9]*)\s*\)\s*;?\s*$",
    re.IGNORECASE,
)
_IVF_INDEX_RE = re.compile(
    r"^\s*CREATE\s+IVFFLAT\s+(L2|IP)\s+INDEX\s+ON\s+([A-Za-z_][A-Za-z_0-9]*)\s*"
    r"\(\s*([A-Za-z_][A-Za-z_0-9]*)\s*\)(?:\s+LISTS\s+(\d+))?\s*;?\s*$",
    re.IGNORECASE,
)


#: read-path compiled-plan cache (see CypherEngine.execute); bounded,
#: cleared wholesale on overflow — correctness never depends on it
_PLAN_CACHE: dict = {}


class CypherEngine:
    def __init__(self, spark: SparkSession, catalog: GraphCatalog | None = None):
        self.spark = spark
        self.catalog = catalog or GraphCatalog(spark)

    @property
    def graph(self) -> Graph | None:
        if self.catalog.current is None:
            return None
        return self.catalog.graphs[self.catalog.current]

    # ------------------------------------------------------------- execute

    def execute(self, text: str) -> DataFrame | None:
        m = re.match(r"\s*EXPLAIN\s+(ANALYZE\s+)?(.*)", text, re.S | re.I)
        if m:
            return self.explain(m.group(2), analyze=bool(m.group(1)))
        ldl = self._label_ddl(text)
        if ldl:
            return None
        if _SQL_RE.match(text):
            self._sync_sql_views()
            return self.spark.sql(text)
        alt = _ALTER_GRAPH_RE.match(text)
        if alt:
            self.catalog.rename_graph(alt.group(1), alt.group(2))
            return None
        ddl = _DDL_RE.match(text)
        if ddl:
            verb, if_not_exists, name, cascade = ddl.groups()
            verb = verb.upper()
            if verb == "CREATE":
                self.catalog.create_graph(name, if_not_exists=bool(if_not_exists))
            elif verb == "USE":
                self.catalog.use_graph(name)
            else:
                self.catalog.drop_graph(name, cascade=bool(cascade))
            return None

        q = parse(text)
        if isinstance(q, A.SingleQuery):
            if all(isinstance(c, A.CreateClause) for c in q.clauses):
                for c in q.clauses:
                    self._execute_create(c)
                return None
            from postgraph_spark.plans.writes import WriteRunner, is_write_clause

            if any(is_write_clause(c) for c in q.clauses):
                if self.graph is None:
                    raise ValueError("no graph selected (USE GRAPH first)")
                return WriteRunner(self.spark, self.graph).run(q)
        # READ-path plan cache — the analog of PG's prepared-statement /
        # plan caching (the reference rides plancache.c): a DataFrame is
        # an immutable logical plan, so the same query text against the
        # same graph SNAPSHOT recompiles to an identical plan; driver-side
        # Catalyst analysis is the dominant repeat cost. Keyed on the
        # graph's current table objects — any write replaces
        # vertices/edges, so mutation naturally invalidates.
        key = None
        if self.graph is not None:
            key = (
                id(self.spark), id(self.graph),
                id(self.graph.vertices), id(self.graph.edges), text,
            )
            hit = _PLAN_CACHE.get(key)
            if hit is not None:
                return hit[0]
        df = Compiler(self.spark, self.graph).compile_query(q)
        if key is not None:
            if len(_PLAN_CACHE) > 256:
                _PLAN_CACHE.clear()
            # pin the keyed objects: live entries keep their ids from
            # being recycled by the allocator (a recycled id would
            # alias a NEW graph onto an old plan)
            _PLAN_CACHE[key] = (df, self.graph, self.graph.vertices, self.graph.edges)
        return df

    def _sync_sql_views(self) -> None:
        """Expose the current graph to Spark SQL the way the reference's
        label heap tables are visible to plain SQL: `vertices`/`edges`
        temp views plus one view per label whose name is a valid
        identifier (SELECT * FROM students ~ the per-label table)."""
        g = self.graph
        if g is None:
            return
        g.vertices.createOrReplaceTempView("vertices")
        g.edges.createOrReplaceTempView("edges")
        for label, kind in g.label_kinds.items():
            if not label.isidentifier() or label.startswith("_"):
                continue
            tbl = g.vertices if kind == "vertex" else g.edges
            tbl.filter(F.col("label") == label).createOrReplaceTempView(label)

    def _label_ddl(self, text: str) -> bool:
        """Dispatch label DDL / constraint statements; returns True when
        the text was one. All require a current graph (the reference's
        functions take the graph name as their first argument; here the
        session's USE'd graph plays that role)."""
        m = _LABEL_RE.match(text)
        m2 = _DROP_LABEL_RE.match(text) if not m else None
        m3 = _UNIQUE_PROPS_RE.match(text) if not (m or m2) else None
        m5 = _IVF_INDEX_RE.match(text) if not (m or m2 or m3) else None
        m4 = _PROP_INDEX_RE.match(text) if not (m or m2 or m3 or m5) else None
        if not (m or m2 or m3 or m4 or m5):
            return False
        if self.graph is None:
            raise ValueError("no graph selected (USE GRAPH first)")
        if m:
            kind = "vertex" if m.group(1).upper() == "VLABEL" else "edge"
            self.graph.create_label(m.group(2), kind)
        elif m2:
            if m2.group(2):
                # drop_label gates `force` and rejects it (label_commands.c:1027)
                raise ValueError("force option is not supported yet")
            self.graph.drop_label(m2.group(1))
        elif m3:
            self.graph.add_unique_constraint(m3.group(1), None)
        elif m5:
            self.graph.create_ivfflat_index(
                m5.group(2), m5.group(3),
                metric=m5.group(1).lower(),
                lists=int(m5.group(4)) if m5.group(4) else 8,
            )
        else:
            label, prop = m4.group(2), m4.group(3)
            if m4.group(1):
                self.graph.add_unique_constraint(label, prop)
            else:
                if label not in self.graph.label_ids:
                    raise ValueError(f'label "{label}" does not exist')
                # non-unique: metadata only — scan-side layout analogs
                # (partition pruning, id cluster/bloom, Z-order) stand in
                self.graph.property_indexes.append({"label": label, "property": prop})
        return True

    def explain(self, text: str, analyze: bool = False) -> DataFrame:
        """EXPLAIN [ANALYZE] <query> — the PG statement surface mapped to
        Spark's plan text: one row per plan line (like PG's QUERY PLAN
        result shape). ANALYZE runs the query's OWN QueryExecution to
        completion (executedPlan().execute() is the AdaptiveSparkPlanExec
        itself; the RDD count moves no rows to the driver) so the
        formatted output carries AQE's final shape (isFinalPlan=true) —
        a separate noop-write execution would leave this df's plan
        un-executed (round-6 ADVICE). Plain EXPLAIN is compile-only."""
        df = self.execute(text)
        if df is None:
            raise ValueError("EXPLAIN needs a reading query")
        if analyze:
            df._jdf.queryExecution().executedPlan().execute().count()
        plan = df._jdf.queryExecution().explainString(
            self.spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        lines = [(ln,) for ln in plan.rstrip().split("\n")]
        return self.spark.createDataFrame(lines, "plan: string")

    def fetch(self, text: str) -> list[tuple]:
        """Execute and decode gval/entity columns to python values."""
        df = self.execute(text)
        if df is None:
            return []
        rows = df.collect()
        out = []
        for row in rows:
            vals = []
            for idx, field in enumerate(df.schema.fields):
                v = row[idx]
                names = set(field.dataType.fieldNames()) if hasattr(field.dataType, "fieldNames") else set()
                if names == {"t", "b", "i", "d", "s", "j"}:
                    vals.append(G.decode(v))
                elif v is not None and "properties" in names:
                    d = v.asDict()
                    d["properties"] = json.loads(d["properties"])
                    vals.append(d)
                else:
                    vals.append(v)
            out.append(tuple(vals))
        return out

    def fetch_values(self, text: str) -> list:
        """Single-column fetch -> flat list."""
        return [r[0] for r in self.fetch(text)]

    # -------------------------------------------------------------- CREATE

    def _execute_create(self, c: A.CreateClause) -> None:
        """Literal CREATE executed into the current graph (fixture-scale;
        the reference allocates graphids from label sequences and inserts
        heap tuples, cypher_create.c:332-540 — here we append rows).

        Vertex variables bind across paths WITHIN one statement only —
        the reference creates a fresh vertex per statement even when a
        variable name is re-used (transform scope is per-query)."""
        g = self.graph
        if g is None:
            raise ValueError("no graph selected (USE GRAPH first)")

        def lit_props(props: A.MapLit | None) -> dict:
            if props is None:
                return {}
            out = {}
            for k, v in props.items.items():
                out[k] = _literal_value(v)
            return out

        vrows: list[tuple[str, dict]] = []
        pending_edges = []  # (label, src_ref, dst_ref, props)
        local_vars: dict[str, int] = {}

        def node_ref(n: A.NodePat):
            if n.var and n.var in local_vars:
                return ("new", local_vars[n.var])
            idx = len(vrows)
            vrows.append((n.label or "_ag_label_vertex", lit_props(n.props)))
            if n.var:
                local_vars[n.var] = idx
            return ("new", idx)

        for path in c.paths:
            els = path.elements
            prev = node_ref(els[0])
            i = 1
            while i < len(els):
                rel: A.RelPat = els[i]
                nxt = node_ref(els[i + 1])
                i += 2
                if rel.direction == "in":
                    src, dst = nxt, prev
                else:
                    src, dst = prev, nxt
                pending_edges.append((rel.label or "_ag_label_edge", src, dst, lit_props(rel.props)))
                prev = nxt

        # build BOTH row sets, enforce constraints on BOTH, then commit —
        # a violation anywhere aborts the whole statement with nothing
        # written (PG statement atomicity; allocated sequence values are
        # consumed either way, exactly like nextval under rollback)
        base_ids, new_v = self._build_vertices(g, vrows)

        def resolve(ref):
            kind, v = ref
            return base_ids[v] if kind == "new" else v

        erows = [(lbl, resolve(s), resolve(d), props) for lbl, s, d, props in pending_edges]
        new_e = self._build_edges(g, erows)
        if new_v is not None:
            g.enforce_unique("vertices", new_v)
        if new_e is not None:
            g.enforce_unique("edges", new_e)
        if new_v is not None:
            self._commit_new(g, "vertices", new_v)
        if new_e is not None:
            self._commit_new(g, "edges", new_e)

    def _build_vertices(self, g: Graph, rows: list[tuple[str, dict]]):
        from postgraph_spark.graph import VERTEX_SCHEMA, make_graphid

        ids = []
        data = []
        for label, props in rows:
            lid, eid = g.alloc_entry_ids(label, 1, kind="vertex")
            gid = make_graphid(lid, eid)
            ids.append(gid)
            data.append((gid, label, json.dumps(props)))
        return ids, (self.spark.createDataFrame(data, VERTEX_SCHEMA) if data else None)

    def _build_edges(self, g: Graph, rows: list[tuple[str, int, int, dict]]):
        from postgraph_spark.graph import EDGE_SCHEMA, make_graphid

        data = []
        for label, src, dst, props in rows:
            lid, eid = g.alloc_entry_ids(label, 1, kind="edge")
            data.append((make_graphid(lid, eid), src, dst, label, json.dumps(props)))
        return self.spark.createDataFrame(data, EDGE_SCHEMA) if data else None

    def _commit_new(self, g: Graph, kind: str, new: DataFrame) -> None:
        g.invalidate_prop_types()
        tbl = g.vertices if kind == "vertices" else g.edges
        if "pv" in tbl.columns:
            new = new.withColumn("pv", F.try_parse_json("properties"))
        tbl = tbl.unionByName(new)
        if g.durable_path:
            # pin the union (bounded lineage across repeated CREATEs),
            # then append ONLY the new rows — O(rows), not the former
            # O(table) full persist (round-5 verdict item #3)
            tbl = tbl.localCheckpoint(eager=True)
        setattr(g, kind, tbl)
        if g.durable_path:
            g.persist_append(kind, new)


def _literal_value(e):
    if isinstance(e, A.Lit):
        return e.value
    if isinstance(e, A.ListLit):
        return [_literal_value(x) for x in e.items]
    if isinstance(e, A.MapLit):
        return {k: _literal_value(v) for k, v in e.items.items()}
    if isinstance(e, A.UnaryOp) and e.op == "-":
        return -_literal_value(e.operand)
    if isinstance(e, A.Cast) and e.type_name in ("numeric", "float", "integer"):
        # PG folds Const casts at plan time (3.8::numeric in a CREATE
        # map is still a literal; old/regress/aggregation.sql:34)
        v = _literal_value(e.operand)
        if isinstance(v, bool) or not isinstance(v, (int, float)):
            raise ValueError("CREATE supports literal properties only")
        if e.type_name == "integer":
            return int(v)
        if e.type_name == "float":
            return float(v)
        return v  # numeric keeps the literal's exact value
    raise ValueError("CREATE supports literal properties only")
