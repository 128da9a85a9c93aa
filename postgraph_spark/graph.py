"""Property-graph data model.

Reference layout: one heap table per label — vertices ``(id graphid,
properties gtype)``, edges ``(id, start_id, end_id, properties)`` — with
Postgres table inheritance making the parent table a scan of all labels
(src/backend/commands/label_commands.c:651-712,
src/backend/commands/graph_commands.c:81-96).

Spark layout: ONE ``vertices`` and ONE ``edges`` DataFrame/parquet table
per graph, with a ``label`` column (partition column on disk). An
unlabeled scan (``MATCH (n)``) is then a plain scan; a labeled scan prunes
partitions — the columnar analog of inheritance + per-label tables.

graphid: 64-bit, 16-bit label id (high) + 48-bit entry id (low), exactly
the reference's packing (src/include/utils/graphid.h:31-64).
Properties: JSON string column (heterogeneous, schemaless — the gtype
document model, src/include/utils/gtype.h); parsed to VariantType at query
time by the expression compiler.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

ENTRY_ID_BITS = 48
ENTRY_ID_MASK = (1 << ENTRY_ID_BITS) - 1
LABEL_ID_MAX = 0xFFFF

VERTEX_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("label", T.StringType(), False),
        T.StructField("properties", T.StringType(), False),
    ]
)

EDGE_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("start_id", T.LongType(), False),
        T.StructField("end_id", T.LongType(), False),
        T.StructField("label", T.StringType(), False),
        T.StructField("properties", T.StringType(), False),
    ]
)


def _spark_atom(dt) -> str | None:
    """Spark column type -> property-catalog atom (None = untypable)."""
    if isinstance(dt, (T.LongType, T.IntegerType, T.ShortType, T.ByteType)):
        return "long"
    if isinstance(dt, (T.DoubleType, T.FloatType, T.DecimalType)):
        return "double"
    if isinstance(dt, T.StringType):
        return "string"
    if isinstance(dt, T.BooleanType):
        return "bool"
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return "timestamp"
    if isinstance(dt, T.DateType):
        return "date"
    if isinstance(dt, T.ArrayType):
        return "array"
    if isinstance(dt, (T.StructType, T.MapType)):
        return "object"
    return None


_I64_MIN, _I64_MAX = -(1 << 63), (1 << 63) - 1


def _py_atom(v) -> str | None:
    """Python property value -> catalog atom. bool before int (bool is an
    int subclass); out-of-int64 ints parse to DECIMAL variants, so they
    are deliberately untyped (None disables narrowing for the prop)."""
    if isinstance(v, bool):
        return "bool"
    if isinstance(v, int):
        return "long" if _I64_MIN <= v <= _I64_MAX else None
    if isinstance(v, float):
        return "double"
    if isinstance(v, str):
        return "string"
    if isinstance(v, list):
        return "array"
    if isinstance(v, dict):
        return "object"
    return None


def _merge_py_atoms(cat: dict, props: dict) -> None:
    """Fold one row's property dict into a label's atom catalog. A None
    (JSON null) value adds no atom (runtime nulls are always allowed);
    an untypable value or a key already marked untyped pins None."""
    for k, v in props.items():
        if v is None:
            cat.setdefault(k, set())
            continue
        a = _py_atom(v)
        cur = cat.get(k, set())
        if a is None or cur is None:
            cat[k] = None
        else:
            cur.add(a)
            cat[k] = cur


def make_graphid(label_id: int, entry_id: int) -> int:
    """Pack (label_id, entry_id) -> graphid (graphid.c:195-217)."""
    if not 0 <= label_id <= LABEL_ID_MAX:
        raise ValueError(f"label_id out of range: {label_id}")
    if not 0 <= entry_id <= ENTRY_ID_MASK:
        raise ValueError(f"entry_id out of range: {entry_id}")
    return (label_id << ENTRY_ID_BITS) | entry_id


def graphid_label_id(col: F.Column) -> F.Column:
    """GET_LABEL_ID: high 16 bits (graphid.h:49)."""
    return F.shiftrightunsigned(col, ENTRY_ID_BITS)


def graphid_entry_id(col: F.Column) -> F.Column:
    """GET_ENTRY_ID: low 48 bits (graphid.h:52)."""
    return col.bitwiseAND(F.lit(ENTRY_ID_MASK))


class Graph:
    """A graph = a vertices DataFrame + an edges DataFrame + a label map.

    ``label_ids`` mirrors the ag_label catalog (src/include/catalog/
    ag_label.h:47-68): label name -> 16-bit id used in graphid packing.
    """

    def __init__(
        self,
        name: str,
        vertices: DataFrame,
        edges: DataFrame,
        label_ids: dict[str, int] | None = None,
        label_kinds: dict[str, str] | None = None,
        constraints: list[dict] | None = None,
    ):
        self.name = name
        self.vertices = vertices
        self.edges = edges
        self.label_ids = dict(label_ids or {})
        #: label-id high-water mark: ids are NEVER reused after DROP
        #: LABEL (graphids pack label_id<<48 | entry_id and each new
        #: label's entry sequence restarts at 1 — reusing a dropped id
        #: would collide two labels' graphids). Persisted in the catalog
        #: so reloads after drops stay safe.
        self._label_id_hwm = max(self.label_ids.values(), default=0)
        #: label -> "vertex" | "edge" (explicit DDL or first write interns
        #: it; the analog of LABEL_TYPE_VERTEX/EDGE in ag_label)
        self.label_kinds = dict(label_kinds or {})
        #: unique constraints: {"label": str, "property": str | None}
        #: (property None = UNIQUE on the whole properties document,
        #: create_unique_properties_constraint; a name = unique property
        #: index, create_property_index is_unique=true —
        #: label_commands.c:271-350, 425-520)
        self.constraints = list(constraints or [])
        #: non-unique property indexes: metadata only — the scan-side
        #: analogs (label-partition pruning, id clustering + bloom,
        #: Z-order layout) do the work a btree would
        self.property_indexes: list[dict] = []
        #: IVFFlat vector indexes (create_ivfflat_{l2,ip}_ops_index,
        #: sql/postgraph.sql.in + ivfflathandler): the TRAINED coarse
        #: quantizer persists here ({label, property, metric, lists,
        #: centroids}); list assignment is recomputed at scan time as a
        #: pure projection against the stored centroids — the layout
        #: philosophy's answer to storing an assignment column
        self.vector_indexes: list[dict] = []
        #: when set, every committed write persists here (the analog of
        #: the reference's heap-table durability; WriteRunner calls
        #: persist() after each commit)
        self.durable_path: str | None = None
        #: current snapshot subdirectory (``snap-N``) under durable_path;
        #: None = legacy flat layout (tables at durable_path/{vertices,edges})
        self._snapshot: str | None = None
        #: property-type catalog (round-12, guide §2.3 narrower types):
        #: label -> {property -> frozenset of gtype atoms ("long",
        #: "double", "string", "bool", "timestamp", "date", "array",
        #: "object"; None = present but untyped)}. Populated ONLY by
        #: builders that know every property's source type (tpch_graph
        #: from native parquet columns; from_rows from the python
        #: values); INVALIDATED wholesale by every data write. A label
        #: in prop_types_complete lists ALL properties that can occur on
        #: it, so an access to an unlisted property is a constant null.
        self.prop_types: dict[str, dict[str, frozenset | None]] = {}
        self.prop_types_complete: set[str] = set()

    def invalidate_prop_types(self) -> None:
        """Drop the property-type catalog (called by every write path:
        a SET/CREATE/MERGE can store any type into any property, so the
        static knowledge dies with the first mutation — narrowing then
        simply stops firing; correctness never depends on the catalog)."""
        self.prop_types = {}
        self.prop_types_complete = set()

    def prop_atoms(self, label: str | None, prop: str) -> frozenset | None:
        """Catalog lookup: the atom set property `prop` of label `label`
        can hold, frozenset() when the label is fully cataloged and the
        property never occurs, None when unknown (no narrowing)."""
        if label is None:
            return None
        cat = self.prop_types.get(label)
        if cat is None:
            return None
        atoms = cat.get(prop)
        if atoms is None and prop not in cat:
            return frozenset() if label in self.prop_types_complete else None
        return atoms

    def vertices_with_label(self, label: str | None) -> DataFrame:
        """Label scan. With a known label id this is a graphid high-bits
        filter (filter_vertices_on_label_id, cypher_clause.c:105) that
        Catalyst turns into partition pruning on the label column."""
        if label is None:
            return self.vertices
        return self.vertices.filter(F.col("label") == label)

    def edges_with_label(self, label: str | None) -> DataFrame:
        if label is None:
            return self.edges
        return self.edges.filter(F.col("label") == label)

    def cache(self) -> "Graph":
        """Materialize both tables in executor memory, SPREAD to cluster
        parallelism first. A small-SF graph arrives as one input
        partition per parquet file and a union keeps per-table
        partitions, so without the spread every scan of a cached label
        runs on ONE core (each label = one partition of the union) —
        observed as a single-straggler stage under every Cypher bench
        row. Decided from file metadata only (no plan-to-RDD probe, see
        operators/dedup._spread); a production graph read from
        thousands of files is already wide -> no-op."""
        par = self.vertices.sparkSession.sparkContext.defaultParallelism
        for attr in ("vertices", "edges"):
            df = getattr(self, attr)
            try:
                nfiles = len(df.inputFiles())
            except Exception:
                nfiles = par
            if 0 < nfiles < par:
                # RANGE partition by (label, id) instead of round-robin:
                # every cached batch then holds ONE label's contiguous id
                # range, so the in-memory columnar batch statistics
                # (inMemoryColumnarStorage.partitionPruning, on by
                # default) let each `label == x` scan SKIP the other
                # labels' batches entirely — a label scan of the cached
                # union reads |label| rows, not |V| (round-11: every
                # graph/Cypher bench row scans labels 2-5x per query).
                # Parallelism is preserved (big labels span many ranges),
                # and id-predicate scans get min/max pruning for free —
                # the id-cluster layout philosophy applied to the cache.
                df = df.repartitionByRange(par, F.col("label"), F.col("id"))
            setattr(self, attr, df.cache())
        return self

    # -- construction helpers -------------------------------------------

    @classmethod
    def from_rows(
        cls,
        spark: SparkSession,
        name: str,
        vertex_rows: list[tuple[str, dict]],
        edge_rows: list[tuple[str, int, int, dict]],
    ) -> "Graph":
        """Build a small fixture graph from python rows.

        vertex_rows: (label, properties) — entry ids assigned sequentially
        per label (per-label sequences, label_commands.c:563-583); the
        vertex's graphid is returned positionally: edge_rows reference
        vertices by their index in vertex_rows.
        edge_rows: (label, src_index, dst_index, properties).
        """
        label_ids: dict[str, int] = {}
        next_entry: dict[str, int] = {}

        def intern(label: str) -> int:
            if label not in label_ids:
                label_ids[label] = max(label_ids.values(), default=0) + 1
            return label_ids[label]

        vids: list[int] = []
        vrows = []
        for label, props in vertex_rows:
            lid = intern(label)
            eid = next_entry.get(label, 0) + 1
            next_entry[label] = eid
            gid = make_graphid(lid, eid)
            vids.append(gid)
            vrows.append((gid, label, json.dumps(props)))
        erows = []
        for label, src, dst, props in edge_rows:
            lid = intern(label)
            eid = next_entry.get(label, 0) + 1
            next_entry[label] = eid
            erows.append((make_graphid(lid, eid), vids[src], vids[dst], label, json.dumps(props)))
        vertices = spark.createDataFrame(vrows, VERTEX_SCHEMA)
        edges = spark.createDataFrame(erows if erows else [], EDGE_SCHEMA)
        g = cls(name, vertices, edges, label_ids)
        # property-type catalog from the python values themselves: every
        # row was seen, so every label is complete by construction
        cat: dict[str, dict] = {}
        for label, props in vertex_rows:
            _merge_py_atoms(cat.setdefault(label, {}), props)
        for label, _s, _d, props in edge_rows:
            _merge_py_atoms(cat.setdefault(label, {}), props)
        g.prop_types = {
            lbl: {k: (frozenset(v) if v is not None else None) for k, v in d.items()}
            for lbl, d in cat.items()
        }
        g.prop_types_complete = set(cat)
        return g

    @classmethod
    def read(cls, spark: SparkSession, path: str, name: str | None = None) -> "Graph":
        """Open a durable graph. catalog.json is the single commit point:
        its ``snapshot`` field names the live ``snap-N`` directory, so a
        reader always sees one fully-consistent (vertices, edges) pair —
        a crash mid-persist leaves either the old or the new snapshot,
        never a torn mix. Graphs written by older layouts (tables directly
        under ``path``) are still readable."""
        meta_path = os.path.join(path, "catalog.json")
        meta = {}
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                meta = json.load(f)
        snapshot = meta.get("snapshot")
        base = os.path.join(path, snapshot) if snapshot else path

        def load(sub: str, schema) -> DataFrame:
            p = os.path.join(base, sub)
            # legacy-layout crash recovery (pre-snapshot per-table swap):
            # if the live dir vanished mid-swap, the .old sibling IS the
            # previous committed table — restore it
            if snapshot is None and not os.path.isdir(p) and os.path.isdir(p + ".old"):
                os.rename(p + ".old", p)
            try:
                return spark.read.schema(schema).parquet(p)
            except Exception:  # empty/new graph: no files yet
                return spark.createDataFrame([], schema)

        vertices = load("vertices", VERTEX_SCHEMA)
        edges = load("edges", EDGE_SCHEMA)
        g = cls(
            name or os.path.basename(path), vertices, edges,
            meta.get("label_ids", {}), meta.get("label_kinds", {}),
            meta.get("constraints", []),
        )
        g.vector_indexes = meta.get("vector_indexes", [])
        g._label_id_hwm = max(g._label_id_hwm, meta.get("label_id_hwm", 0))
        g.durable_path = path
        g._snapshot = snapshot
        return g

    def _table_dir(self, kind: str) -> str:
        """Resolved on-disk directory for a table under the live snapshot
        (or the legacy flat layout when no snapshot pointer exists)."""
        base = (
            os.path.join(self.durable_path, self._snapshot)
            if self._snapshot
            else self.durable_path
        )
        return os.path.join(base, kind)

    @staticmethod
    def _table_writer(df: DataFrame, schema):
        """Writer with the btree-index analogs applied (ag_label btree
        indexes on id, label_commands.c): rows CLUSTERED by graphid
        within each label partition (tight row-group min/max id stats →
        a point/range lookup on id prunes row groups, the columnar
        B-tree) plus a parquet BLOOM FILTER on id for point probes that
        fall inside a row group's range. Both are scan-side free: no
        extra files, no shuffle (sortWithinPartitions is partition-local).
        """
        return (
            df.select(*schema.fieldNames())
            .sortWithinPartitions("id")
            .write.option("parquet.bloom.filter.enabled#id", "true")
            .option("parquet.bloom.filter.expected.ndv#id", "10000000")
        )

    def write(self, path: str, mode: str = "overwrite") -> None:
        """Export a flat-layout copy (tables directly under `path`),
        partitioned by label → labeled scans prune partitions. NOT the
        durable-commit path — that is persist()/persist_append with the
        snap-N pointer scheme; exporting onto the live durable path
        would write a snapshot-less catalog.json beside snapshot tables
        and orphan them, so it is refused."""
        if self.durable_path and os.path.abspath(path) == os.path.abspath(self.durable_path):
            raise ValueError("use persist() for the durable path, write() only exports")
        os.makedirs(path, exist_ok=True)
        self._table_writer(self.vertices, VERTEX_SCHEMA).mode(mode).partitionBy(
            "label"
        ).parquet(os.path.join(path, "vertices"))
        self._table_writer(self.edges, EDGE_SCHEMA).mode(mode).partitionBy(
            "label"
        ).parquet(os.path.join(path, "edges"))
        with open(os.path.join(path, "catalog.json"), "w") as f:
            json.dump({"name": self.name, "label_ids": self.label_ids}, f)

    def _write_catalog(self) -> None:
        """Atomic catalog.json update (temp file + rename). Carries the
        live-snapshot pointer, so this rename IS the commit point for
        full persists."""
        if not self.durable_path:
            return
        os.makedirs(self.durable_path, exist_ok=True)
        tmp = os.path.join(self.durable_path, ".catalog.json.tmp")
        meta = {"name": self.name, "label_ids": self.label_ids}
        hwm = max(self._label_id_hwm, max(self.label_ids.values(), default=0))
        if hwm:
            meta["label_id_hwm"] = hwm
        if self.label_kinds:
            meta["label_kinds"] = self.label_kinds
        if self.constraints:
            meta["constraints"] = self.constraints
        if self.vector_indexes:
            meta["vector_indexes"] = self.vector_indexes
        if self._snapshot:
            meta["snapshot"] = self._snapshot
        with open(tmp, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, os.path.join(self.durable_path, "catalog.json"))

    def persist(self) -> None:
        """FULL durable snapshot, atomically: write BOTH tables into a
        fresh versioned ``snap-N`` directory, then commit with a single
        catalog.json pointer rename — a crash at any point leaves either
        the previous or the new snapshot fully consistent (never a torn
        new-vertices/old-edges mix). Superseded snapshot directories are
        garbage-collected after the commit (and opportunistically on the
        next persist if that cleanup itself was interrupted).
        Incremental commits (the per-statement path) use persist_append /
        persist_partitions instead; a lakehouse deployment swaps all of
        this for Delta append/MERGE, which versions instead of swapping.
        Both tables are pinned (localCheckpoint) first — removing files a
        table's lineage still reads would otherwise invalidate it
        (classic parquet overwrite-while-reading hazard)."""
        if not self.durable_path:
            return
        self.vertices = self.vertices.localCheckpoint(eager=True)
        self.edges = self.edges.localCheckpoint(eager=True)
        os.makedirs(self.durable_path, exist_ok=True)
        prev = self._snapshot
        epoch = int(prev.rsplit("-", 1)[1]) + 1 if prev else 1
        new_rel = f"snap-{epoch}"
        new_dir = os.path.join(self.durable_path, new_rel)
        shutil.rmtree(new_dir, ignore_errors=True)
        for kind, tbl, schema in (
            ("vertices", self.vertices, VERTEX_SCHEMA),
            ("edges", self.edges, EDGE_SCHEMA),
        ):
            self._table_writer(tbl, schema).mode("overwrite").partitionBy(
                "label"
            ).parquet(os.path.join(new_dir, kind))
            # an empty table writes no directory at all — materialize it
            # so read() finds a uniform layout
            os.makedirs(os.path.join(new_dir, kind), exist_ok=True)
        self._snapshot = new_rel
        self._write_catalog()  # <- the atomic commit of both tables
        # GC: superseded snapshots and any legacy flat-layout tables
        for entry in os.listdir(self.durable_path):
            p = os.path.join(self.durable_path, entry)
            stale_snap = entry.startswith("snap-") and entry != new_rel
            legacy = prev is None and entry in (
                "vertices", "edges", "vertices.old", "edges.old"
            )
            if os.path.isdir(p) and (stale_snap or legacy):
                shutil.rmtree(p, ignore_errors=True)

    def persist_append(self, kind: str, new_rows: DataFrame) -> None:
        """Durable CREATE/MERGE commit: append ONLY the new rows into the
        live snapshot's label partitions — O(new rows) I/O, not an
        O(table) rewrite (round-4 verdict's write-path scale-killer).
        The catalog (which may have interned new labels) is committed
        FIRST: a crash between the two steps then leaves at worst an
        unused label id, never durable rows under a label missing from
        the reloaded catalog. Parquet appends are crash-safe at job
        granularity: the output committer moves files into place at job
        commit, so an interrupted append leaves only ignorable staging
        trash."""
        if not self.durable_path:
            return
        self._write_catalog()
        schema = VERTEX_SCHEMA if kind == "vertices" else EDGE_SCHEMA
        self._table_writer(new_rows, schema).mode("append").partitionBy(
            "label"
        ).parquet(self._table_dir(kind))

    def persist_partitions(self, kind: str, labels: list[str]) -> None:
        """Durable SET/DELETE commit: rewrite ONLY the touched label
        partitions (dynamic partition overwrite) from the pinned
        in-memory table — O(touched partitions), not O(table). A label
        whose partition became empty writes no files under dynamic
        overwrite, so its stale directory is removed explicitly —
        matching on the UNESCAPED partition value, since Spark
        percent-escapes special characters (space, ':', '/') in
        partition directory names."""
        if not self.durable_path or not labels:
            return
        tbl = self.vertices if kind == "vertices" else self.edges
        schema = VERTEX_SCHEMA if kind == "vertices" else EDGE_SCHEMA
        sub = self._table_dir(kind)
        if not os.path.isdir(sub):  # never snapshotted yet: full write
            self.persist()
            return
        remaining = tbl.filter(F.col("label").isin(labels))
        (
            self._table_writer(remaining, schema)
            .mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("label")
            .parquet(sub)
        )
        present = {
            r["label"]
            for r in remaining.select("label").distinct().collect()
        }
        from urllib.parse import unquote

        gone = {label for label in labels if label not in present}
        if gone:
            for entry in os.listdir(sub):
                if entry.startswith("label=") and unquote(entry[6:]) in gone:
                    shutil.rmtree(os.path.join(sub, entry), ignore_errors=True)
        self._write_catalog()

    # -- label DDL + constraints ----------------------------------------

    def _alloc_label_id(self) -> int:
        """Next never-used label id: max(live ids, persisted high-water
        mark) + 1, so ids of dropped labels are never recycled
        (graphid = label_id<<48 | entry_id — a recycled id with a fresh
        entry sequence would collide with a surviving label's ids)."""
        self._label_id_hwm = (
            max(self._label_id_hwm, max(self.label_ids.values(), default=0)) + 1
        )
        return self._label_id_hwm

    def create_label(self, label: str, kind: str) -> None:
        """create_vlabel / create_elabel (label_commands.c:170-265):
        error if the label already exists; otherwise intern its id and
        record its kind. (Cypher CREATE still auto-creates missing
        labels, as the reference's write path does.)"""
        if label in self.label_ids:
            raise ValueError(f'label "{label}" already exists')
        self.label_ids[label] = self._alloc_label_id()
        self.label_kinds[label] = kind
        self._write_catalog()

    def drop_label(self, label: str) -> None:
        """drop_label (label_commands.c:976-1040): error if the label
        does not exist; removes the label's rows (the reference drops
        the label's heap table — dangling edges are possible there too,
        only `force` is gated and unsupported)."""
        if label not in self.label_ids:
            raise ValueError(f'label "{label}" does not exist')
        kind = self.label_kinds.get(label)
        tables = ("vertices", "edges") if kind is None else (
            ("vertices",) if kind == "vertex" else ("edges",)
        )
        for attr in tables:
            tbl = getattr(self, attr)
            setattr(self, attr, tbl.filter(F.col("label") != label))
            if self.durable_path:
                setattr(self, attr, getattr(self, attr).localCheckpoint(eager=True))
                self.persist_partitions(attr, [label])
        del self.label_ids[label]
        self.label_kinds.pop(label, None)
        self.constraints = [c for c in self.constraints if c["label"] != label]
        if hasattr(self, "_next_entry"):
            self._next_entry.pop(label, None)
        self._write_catalog()

    def _unique_key_col(self, prop: str | None) -> F.Column:
        """Equality key over a `properties` JSON column for unique
        enforcement. Whole-document constraints key on the canonical
        object text (sorted keys, numbers through their double image) so
        {a:1,b:2} and {b:2,a:1.0} collide, matching gtype equality of
        the properties value; a named property keys on its canonical
        scalar text (null property -> SQL null, which unique ignores —
        PG btree semantics)."""
        from postgraph_spark.functions import gtype as G

        if prop is None:
            return G._obj_canon_txt(F.col("properties"))
        v = F.try_variant_get(F.try_parse_json(F.col("properties")), f"$.{prop}", "variant")
        return G.canon_key_text(G.from_variant(v))

    def add_unique_constraint(self, label: str, prop: str | None = None) -> None:
        """create_unique_properties_constraint (prop=None) /
        create_property_index(..., is_unique=true) — ALTER TABLE ADD
        CONSTRAINT builds the unique index over EXISTING rows first, so
        pre-existing duplicates fail the DDL (label_commands.c:271-350).
        """
        if label not in self.label_ids:
            raise ValueError(f'label "{label}" does not exist')
        kind = self.label_kinds.get(label)
        tables = ("vertices", "edges") if kind is None else (
            ("vertices",) if kind == "vertex" else ("edges",)
        )
        key = None
        for attr in tables:
            tbl = getattr(self, attr).filter(F.col("label") == label)
            # the canonical-key dup plan is expensive to even COMPILE
            # (codegen over the variant canon expressions); the common
            # DDL-then-load order hits an empty label — probe that with
            # a trivial plan first
            if tbl.limit(1).isEmpty():
                continue
            if key is None:
                key = self._unique_key_col(prop)
            dup = (
                tbl.select(key.alias("__k"))
                .filter(F.col("__k").isNotNull())
                .groupBy("__k").count().filter(F.col("count") > 1)
            )
            if not dup.isEmpty():
                what = f'property "{prop}"' if prop else "properties"
                raise ValueError(
                    f'cannot add unique constraint on {label}.{what}: existing duplicate values'
                )
        self.constraints.append({"label": label, "property": prop})
        self._write_catalog()

    def enforce_unique(self, kind: str, new_rows: DataFrame) -> None:
        """Pre-commit unique check for a write batch (the distributed
        analog of the btree uniqueness probe each reference insert
        performs): for every constrained label present in the batch,
        (1) no two batch rows share a key, (2) no batch key exists in
        the stored label partition — one partial-agg job + one
        semi-join per constrained label, both label-partition-pruned,
        nothing beyond a yes/no reaches the driver."""
        if not self.constraints:
            return
        batch_labels = {r["label"] for r in new_rows.select("label").distinct().collect()}
        table = self.vertices if kind == "vertices" else self.edges
        for c in self.constraints:
            if c["label"] not in batch_labels:
                continue
            key = self._unique_key_col(c["property"])
            newk = (
                new_rows.filter(F.col("label") == c["label"])
                .select(key.alias("__k"))
                .filter(F.col("__k").isNotNull())
            )
            what = f'{c["label"]}.{c["property"]}' if c["property"] else f'{c["label"]}.properties'
            existing = table.filter(F.col("label") == c["label"]).select(key.alias("__k"))
            # both checks in ONE job: a key violates if the batch carries
            # it twice, or once while the stored partition already has it
            # (stored nulls group under the null key, where the batch
            # contributes nothing — nulls never violate, PG btree
            # semantics)
            viol = (
                newk.withColumn("__n", F.lit(1)).withColumn("__o", F.lit(0))
                .unionByName(
                    existing.withColumn("__n", F.lit(0)).withColumn("__o", F.lit(1))
                )
                .groupBy("__k")
                .agg(F.sum("__n").alias("__nn"), F.sum("__o").alias("__oo"))
                .filter(
                    (F.col("__nn") > 1) | ((F.col("__nn") >= 1) & (F.col("__oo") >= 1))
                )
            )
            if not viol.isEmpty():
                raise ValueError(f"duplicate key value violates unique constraint on {what}")

    def _vector_prop_col(self, prop: str) -> F.Column:
        """A vector property (JSON number array) as array<double>."""
        return F.from_json(F.get_json_object(F.col("properties"), f"$.{prop}"), "array<double>")

    def create_ivfflat_index(
        self, label: str, prop: str, metric: str = "l2", lists: int = 8, iters: int = 3
    ) -> None:
        """create_ivfflat_l2_ops_index / create_ivfflat_ip_ops_index
        (sql/postgraph.sql.in; ivfkmeans.c trains the list centroids):
        train a k-means coarse quantizer over the label's vector
        property and persist the centroids in the catalog. `metric`:
        'l2' or 'ip' (inner product; training is L2 k-means either way,
        as in ivfkmeans)."""
        from postgraph_spark.operators.clustering import kmeans

        if label not in self.label_ids:
            raise ValueError(f'label "{label}" does not exist')
        if metric not in ("l2", "ip"):
            raise ValueError(f"unknown ivfflat ops {metric!r}")
        tbl = self.vertices if self.label_kinds.get(label) != "edge" else self.edges
        vecs = (
            tbl.filter(F.col("label") == label)
            .select("id", self._vector_prop_col(prop).alias("__v"))
            .filter(F.col("__v").isNotNull())
        )
        _, centroids = kmeans(vecs, "__v", "id", k=lists, iters=iters)
        self.vector_indexes = [
            ix for ix in self.vector_indexes
            if not (ix["label"] == label and ix["property"] == prop)
        ] + [{
            "label": label, "property": prop, "metric": metric,
            "lists": lists, "centroids": centroids,
        }]
        self._write_catalog()

    def ivf_search(
        self, label: str, prop: str, query_vec: list[float], k: int = 5, nprobe: int = 1
    ) -> DataFrame:
        """Probe a trained IVFFlat index: the query's `nprobe` nearest
        lists are picked driver-side (k-means centroids are catalog
        metadata), candidate rows assign to lists by pure projection
        against the SAME centroids, and only probed-list rows are
        ranked. Returns (id, dist) ordered best-first; dist is L2 or
        negative inner product per the index metric."""
        from postgraph_spark.operators.clustering import _sq_dist, assign_clusters

        ix = next(
            (x for x in self.vector_indexes
             if x["label"] == label and x["property"] == prop),
            None,
        )
        if ix is None:
            raise ValueError(f"no ivfflat index on {label}.{prop}")
        q = [float(x) for x in query_vec]

        def sq(c):
            return sum((a - b) * (a - b) for a, b in zip(q, c))

        ranked = sorted(range(len(ix["centroids"])), key=lambda i: (sq(ix["centroids"][i]), i))
        probe = ranked[:nprobe]
        tbl = self.vertices if self.label_kinds.get(label) != "edge" else self.edges
        rows = (
            tbl.filter(F.col("label") == label)
            .select("id", self._vector_prop_col(prop).alias("__v"))
            .filter(F.col("__v").isNotNull())
        )
        rows = rows.withColumn("__list", assign_clusters(rows, "__v", ix["centroids"]))
        cand = rows.filter(F.col("__list").isin(probe))
        qc = F.array(*[F.lit(x) for x in q])
        if ix["metric"] == "l2":
            dist = F.sqrt(_sq_dist(F.col("__v"), q))
        else:  # ip: pgvector <#> is NEGATIVE inner product
            dist = -F.aggregate(
                F.zip_with(F.col("__v"), qc, lambda a, b: a * b),
                F.lit(0.0), lambda acc, x: acc + x,
            )
        return (
            cand.select("id", dist.alias("dist"))
            .orderBy(F.col("dist").asc(), F.col("id"))
            .limit(k)
        )

    def enforce_unique_post_update(self, table: DataFrame, labels: list[str]) -> None:
        """Post-UPDATE unique check (the btree index also rejects
        UPDATEs that create duplicates — old/regress/index.sql Test 3):
        given the candidate post-update table, any constrained label
        among the touched `labels` must hold no duplicate keys. One
        label-pruned partial-agg job per constrained touched label."""
        for c in self.constraints:
            if c["label"] not in labels:
                continue
            key = self._unique_key_col(c["property"])
            dup = (
                table.filter(F.col("label") == c["label"])
                .select(key.alias("__k"))
                .filter(F.col("__k").isNotNull())
                .groupBy("__k").count().filter(F.col("count") > 1)
            )
            what = f'{c["label"]}.{c["property"]}' if c["property"] else f'{c["label"]}.properties'
            if not dup.isEmpty():
                raise ValueError(f"duplicate key value violates unique constraint on {what}")

    def alloc_entry_ids(self, label: str, n: int, kind: str | None = None) -> tuple[int, int]:
        """Reserve n per-label sequence values -> (label_id,
        first_entry_id). Mirrors the reference's label sequences
        (label_commands.c:563-583); the high-water mark is recovered
        from the stored tables on first use per label, so a REOPENED
        durable graph never re-issues ids. A declared label kind
        (create_vlabel/create_elabel) is enforced: writing an edge into
        a vertex label is the shape mismatch the reference's per-kind
        table schemas reject."""
        if kind is not None:
            declared = self.label_kinds.get(label)
            if declared is not None and declared != kind:
                raise ValueError(f'label "{label}" is a {declared} label, not {kind}')
            self.label_kinds.setdefault(label, kind)
        lid = self.label_ids.get(label)
        if lid is None:
            lid = self.label_ids[label] = self._alloc_label_id()
        if not hasattr(self, "_next_entry"):
            self._next_entry: dict[str, int] = {}
        if label not in self._next_entry:
            mx = 0
            for tbl in (self.vertices, self.edges):
                row = (
                    tbl.filter(F.col("label") == label)
                    .agg(F.max(graphid_entry_id(F.col("id"))).alias("m"))
                    .collect()[0]
                )
                mx = max(mx, row["m"] or 0)
            self._next_entry[label] = mx
        base = self._next_entry[label] + 1
        self._next_entry[label] += n
        return lid, base


class GraphCatalog:
    """CREATE/USE/DROP GRAPH (graph_commands.c:60-96). In-memory registry
    backed by an optional root directory of parquet graphs."""

    def __init__(self, spark: SparkSession, root: str | None = None):
        self.spark = spark
        self.root = root
        self.graphs: dict[str, Graph] = {}
        self.current: str | None = None

    def create_graph(self, name: str, if_not_exists: bool = False) -> Graph:
        """create_graph / create_graph_if_not_exists
        (graph_commands.c:60-96; old/regress/catalog.out:401-411): plain
        create errors on a duplicate name; the IF NOT EXISTS form is
        idempotent and returns the existing graph untouched."""
        if name in self.graphs:
            if if_not_exists:
                return self.graphs[name]
            raise ValueError(f"graph {name!r} already exists")
        g = Graph.from_rows(self.spark, name, [], [])
        if self.root:
            g.durable_path = os.path.join(self.root, name)
            g.persist()
        self.graphs[name] = g
        if self.current is None:
            self.current = name
        return g

    def use_graph(self, name: str) -> Graph:
        if name not in self.graphs:
            if self.root and os.path.isdir(os.path.join(self.root, name)):
                self.graphs[name] = Graph.read(self.spark, os.path.join(self.root, name), name)
            else:
                raise ValueError(f"graph {name!r} does not exist")
        self.current = name
        return self.graphs[name]

    def drop_graph(self, name: str, cascade: bool = False) -> None:
        """drop_graph (graph_commands.c; old/regress/catalog.out:69-84):
        errors on a missing graph; without cascade errors because the
        label tables always depend on the graph (even a fresh graph
        carries _ag_label_vertex/_ag_label_edge); cascade drops the
        graph and, for durable graphs, removes the backing directory."""
        if name not in self.graphs:
            raise ValueError(f"graph {name!r} does not exist")
        g = self.graphs[name]
        if not cascade:
            deps = ", ".join(sorted(g.label_ids)) or "_ag_label_vertex, _ag_label_edge"
            raise ValueError(
                f"cannot drop graph {name} because other objects depend on it"
                f" (labels: {deps}); use DROP GRAPH {name} CASCADE"
            )
        self.graphs.pop(name)
        if g.durable_path and os.path.isdir(g.durable_path):
            shutil.rmtree(g.durable_path)
        if self.current == name:
            self.current = None

    def rename_graph(self, name: str, new_name: str) -> Graph:
        """alter_graph(name, 'RENAME', new) (graph_commands.c:380-430).
        Durable graphs move their backing directory with the name."""
        if name not in self.graphs:
            raise ValueError(f"graph {name!r} does not exist")
        if new_name in self.graphs:
            raise ValueError(f"graph {new_name!r} already exists")
        g = self.graphs.pop(name)
        g.name = new_name
        if g.durable_path and self.root:
            new_path = os.path.join(self.root, new_name)
            os.rename(g.durable_path, new_path)
            g.durable_path = new_path
            # reload lazily-read tables from the moved directory so
            # lineage does not point at the old path
            reloaded = Graph.read(self.spark, new_path, new_name)
            g.vertices, g.edges = reloaded.vertices, reloaded.edges
            g._snapshot = reloaded._snapshot
            g._write_catalog()
        self.graphs[new_name] = g
        if self.current == name:
            self.current = new_name
        return g

    def register(self, graph: Graph) -> Graph:
        self.graphs[graph.name] = graph
        if self.current is None:
            self.current = graph.name
        return graph


# -- graph projection of the relational star schema (FIXTURES.md F8) -----

TPCH_VLABELS = {"customer": 1, "orders": 2, "part": 3, "supplier": 4, "nation": 5}
TPCH_ELABELS = {"placed": 6, "contains": 7, "from_nation": 8, "supplied_by": 9}


_GRAPH_CACHE: dict[tuple[str, str], "Graph"] = {}


def tpch_graph(spark: SparkSession, sf_dir: str, use_cache: bool = True) -> Graph:
    """Project the TPC-H-ish tables into a property graph.

    vertices: customer / orders / part / supplier / nation rows.
    edges: placed (customer->orders), contains (orders->part, lineitem
    props), from_nation (customer->nation, supplier->nation).
    All built declaratively — at 100 TB this is a column-pruned scan plus
    a narrow projection, no shuffle.

    Each table carries BOTH a ``properties`` JSON string (the schemaless
    document, for output parity) and a ``pv`` VARIANT column built
    directly from the native columns with to_variant_object — the
    document is never parsed from text, and every property access
    downstream is a binary variant_get. The graph is memoized per
    (session, sf_dir) and cached: the reference stores its graph in heap
    tables; the Spark analog of "the graph exists" is a materialized
    (cached / parquet-backed) projection, not a rebuild per query.
    """
    key = (spark.sparkContext.applicationId, os.path.abspath(sf_dir))
    if use_cache and key in _GRAPH_CACHE:
        return _GRAPH_CACHE[key]

    prop_types: dict[str, dict[str, frozenset | None]] = {}

    def _record_types(label: str, df: DataFrame, cols: list[str]) -> None:
        prop_types[label] = {
            f.name: (frozenset({a}) if (a := _spark_atom(f.dataType)) else None)
            for f in df.schema.fields
            if f.name in cols
        }

    def vtab(name: str, key: str, cols: list[str]) -> DataFrame:
        df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
        _record_types(name, df, cols)
        lid = TPCH_VLABELS[name]
        ps = F.struct(*[F.col(c) for c in cols])
        return df.select(
            (F.lit(lid).cast("long") * F.lit(1 << ENTRY_ID_BITS) + F.col(key).cast("long")).alias("id"),
            F.lit(name).alias("label"),
            F.to_json(ps).alias("properties"),
            F.to_variant_object(ps).alias("pv"),
        )

    vertices = (
        vtab("customer", "c_custkey", ["c_custkey", "c_name", "c_acctbal", "c_mktsegment"])
        .unionByName(vtab("orders", "o_orderkey", ["o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority", "o_orderdate"]))
        .unionByName(vtab("part", "p_partkey", ["p_partkey", "p_name", "p_brand", "p_type", "p_size"]))
        .unionByName(vtab("supplier", "s_suppkey", ["s_suppkey", "s_name", "s_acctbal"]))
        .unionByName(vtab("nation", "n_nationkey", ["n_nationkey", "n_name"]))
    )

    def gid(label: str, key_col: F.Column, table: dict[str, int] = TPCH_VLABELS) -> F.Column:
        return F.lit(table[label]).cast("long") * F.lit(1 << ENTRY_ID_BITS) + key_col.cast("long")

    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    customer = spark.read.parquet(os.path.join(sf_dir, "customer.parquet"))
    supplier = spark.read.parquet(os.path.join(sf_dir, "supplier.parquet"))
    lineitem = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))

    def eid(label: str, seq: F.Column) -> F.Column:
        return F.lit(TPCH_ELABELS[label]).cast("long") * F.lit(1 << ENTRY_ID_BITS) + seq

    empty_pv = F.try_parse_json(F.lit("{}"))  # constant-folded
    placed = orders.select(
        eid("placed", F.col("o_orderkey").cast("long")).alias("id"),
        gid("customer", F.col("o_custkey")).alias("start_id"),
        gid("orders", F.col("o_orderkey")).alias("end_id"),
        F.lit("placed").alias("label"),
        F.lit("{}").alias("properties"),
        empty_pv.alias("pv"),
    )
    li_props = F.struct(
        F.col("l_quantity").alias("quantity"),
        F.col("l_extendedprice").alias("extendedprice"),
        F.col("l_discount").alias("discount"),
    )
    contains = lineitem.select(
        eid("contains", F.col("l_orderkey") * 8 + F.col("l_linenumber")).alias("id"),
        gid("orders", F.col("l_orderkey")).alias("start_id"),
        gid("part", F.col("l_partkey")).alias("end_id"),
        F.lit("contains").alias("label"),
        F.to_json(li_props).alias("properties"),
        F.to_variant_object(li_props).alias("pv"),
    )
    cust_nation = customer.select(
        eid("from_nation", F.col("c_custkey").cast("long")).alias("id"),
        gid("customer", F.col("c_custkey")).alias("start_id"),
        gid("nation", F.col("c_nationkey")).alias("end_id"),
        F.lit("from_nation").alias("label"),
        F.lit("{}").alias("properties"),
        empty_pv.alias("pv"),
    )
    supp_nation = supplier.select(
        eid("from_nation", F.lit(1 << 40) + F.col("s_suppkey").cast("long")).alias("id"),
        gid("supplier", F.col("s_suppkey")).alias("start_id"),
        gid("nation", F.col("s_nationkey")).alias("end_id"),
        F.lit("from_nation").alias("label"),
        F.lit("{}").alias("properties"),
        empty_pv.alias("pv"),
    )
    edges = placed.unionByName(contains).unionByName(cust_nation).unionByName(supp_nation)
    label_ids = dict(TPCH_VLABELS)
    label_ids.update(TPCH_ELABELS)
    g = Graph("tpch", vertices, edges, label_ids)
    # the contains edge renames lineitem columns in li_props
    li_types = {
        f.name: (frozenset({a}) if (a := _spark_atom(f.dataType)) else None)
        for f in lineitem.schema.fields
    }
    prop_types["contains"] = {
        "quantity": li_types.get("l_quantity"),
        "extendedprice": li_types.get("l_extendedprice"),
        "discount": li_types.get("l_discount"),
    }
    # placed / from_nation carry an empty properties document
    prop_types["placed"] = {}
    prop_types["from_nation"] = {}
    g.prop_types = prop_types
    g.prop_types_complete = set(prop_types)
    if use_cache:
        g.cache()
        _GRAPH_CACHE[key] = g
    return g
