"""CQL export — cells -> wide typed CQL rows.

Reproduces the reference's CQL-row export (org/coursera/mapreducer/
CQLMapper.java + com/netflix/aegisthus/util/CFMetadataUtility.java): a
``CREATE TABLE`` statement supplies the schema; each partition's cells are
regrouped by clustering prefix into one row per (partition key, clustering
values), with typed value composition (CQLMapper.java:159-189: uuid ->
string, timestamp -> epoch, blob -> bytes).

Differences from the reference (all improvements):
- runs on **merged** (compacted) cells, so multi-generation inputs work —
  the reference's map-only job is correct only for a single compacted
  generation (SSTableExport.java:174-180);
- list collections are supported (cells named ``(col, timeuuid)`` are
  gathered time-ordered into an array) — the reference throws
  (CQLMapper.java:149-153);
- the composite-name split and all common type compositions are JVM-side
  Spark expressions; only exotic types fall back to the Python registry.

Static columns (the 0xFFFF static prefix) are recognized and broadcast to
every row of the partition via a window, mirroring CQLMapper.java:102-111.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# DDL parsing (CFMetadataUtility analog — a CREATE TABLE subset, no Cassandra)
# ---------------------------------------------------------------------------

#: CQL type -> (comparator name, spark compose type)
CQL_TYPES = {
    "text": "UTF8Type",
    "varchar": "UTF8Type",
    "ascii": "AsciiType",
    "int": "Int32Type",
    "bigint": "LongType",
    "counter": "LongType",
    "uuid": "UUIDType",
    "timeuuid": "TimeUUIDType",
    "timestamp": "TimestampType",
    "double": "DoubleType",
    "float": "FloatType",
    "boolean": "BooleanType",
    "blob": "BytesType",
    "decimal": "DecimalType",
}

_COLLECTION = re.compile(r"^(list|set|map)\s*<\s*([\w]+)\s*(?:,\s*([\w]+)\s*)?>$", re.I)
_FROZEN = re.compile(r"^frozen\s*<\s*(.+)\s*>$", re.I | re.S)
_TUPLE = re.compile(r"^tuple\s*<\s*(.+)\s*>$", re.I | re.S)


@dataclass
class CqlColumn:
    name: str
    cql_type: str
    kind: str = "regular"  # regular | partition_key | clustering | static
    collection: str | None = None  # list | set | map | tuple
    element_type: str | None = None  # list/set element, or map KEY type
    value_type: str | None = None  # map VALUE type
    frozen: bool = False  # frozen<...>: whole collection in ONE cell blob
    tuple_types: list[str] | None = None  # tuple<...> component types


@dataclass
class CqlSchema:
    table: str
    columns: list[CqlColumn] = field(default_factory=list)

    @property
    def partition_keys(self) -> list[CqlColumn]:
        return [c for c in self.columns if c.kind == "partition_key"]

    @property
    def clustering(self) -> list[CqlColumn]:
        return [c for c in self.columns if c.kind == "clustering"]

    @property
    def regulars(self) -> list[CqlColumn]:
        return [c for c in self.columns if c.kind == "regular"]

    @property
    def statics(self) -> list[CqlColumn]:
        return [c for c in self.columns if c.kind == "static"]


def _ident(tok: str) -> str:
    """CQL identifier: quoted = case-sensitive (quotes stripped), unquoted =
    lowercased — matching Cassandra's identifier rules, so the parsed name
    equals the raw cell-name bytes on disk."""
    tok = tok.strip()
    if len(tok) >= 2 and tok.startswith('"') and tok.endswith('"'):
        return tok[1:-1]
    return tok.lower()


def parse_create_table(ddl: str) -> CqlSchema:
    """Parse a CREATE TABLE statement (the CFMetadataUtility entry point).

    The column-list body is extracted by PAREN MATCHING, not a greedy
    regex, so a trailing ``WITH`` clause containing parentheses (e.g.
    ``WITH CLUSTERING ORDER BY (ck DESC)``) parses. Clustering order is
    accepted and ignored — the reference's CQL export unwraps ReversedType
    the same way (CQLMapper.java:168-170)."""
    s = ddl.strip().rstrip(";")
    m = re.search(
        r"create\s+table\s+(?:if\s+not\s+exists\s+)?([\w.\"]+)\s*\(", s, re.I
    )
    if not m:
        raise ValueError(f"unparseable CREATE TABLE: {ddl[:120]}")
    table = m.group(1).split(".")[-1].strip('"')
    i = m.end() - 1  # index of the opening paren of the column list
    depth = 0
    for j in range(i, len(s)):
        if s[j] == "(":
            depth += 1
        elif s[j] == ")":
            depth -= 1
            if depth == 0:
                break
    else:
        raise ValueError(f"unbalanced parens in CREATE TABLE: {ddl[:120]}")
    body = s[i + 1 : j]
    tail = s[j + 1 :].strip()
    if tail and not re.match(r"with\b", tail, re.I):
        raise ValueError(f"unexpected trailing clause: {tail[:80]}")

    # split on top-level commas (parens nest for PRIMARY KEY and generics)
    parts, depth, cur = [], 0, []
    for ch in body:
        if ch in "(<":
            depth += 1
        elif ch in ")>":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    if "".join(cur).strip():
        parts.append("".join(cur).strip())

    schema = CqlSchema(table)
    pk_spec: list[str] | None = None
    inline_pk: str | None = None
    for p in parts:
        pk = re.match(r"primary\s+key\s*\((.*)\)\s*$", p, re.I | re.S)
        if pk:
            pk_spec = _split_pk(pk.group(1))
            continue
        cm = re.match(r'("?[\w]+"?)\s+(.+?)(\s+static)?(\s+primary\s+key)?$', p, re.I | re.S)
        if not cm:
            raise ValueError(f"unparseable column def: {p}")
        name = _ident(cm.group(1))
        type_str = cm.group(2).strip().lower()
        col = CqlColumn(name, type_str)
        inner = type_str
        fz = _FROZEN.match(inner)
        if fz:
            col.frozen = True
            inner = fz.group(1).strip()
        tup = _TUPLE.match(inner)
        coll = _COLLECTION.match(inner)
        if tup:
            # tuples are always frozen (single-blob) in Cassandra
            col.frozen = True
            col.collection = "tuple"
            col.tuple_types = [t.strip() for t in tup.group(1).split(",")]
            for t in col.tuple_types:
                if t not in CQL_TYPES:
                    raise ValueError(f"unsupported tuple component type: {t}")
        elif coll:
            col.collection = coll.group(1).lower()
            col.element_type = coll.group(2).lower()
            col.value_type = coll.group(3).lower() if coll.group(3) else None
        elif inner not in CQL_TYPES:
            raise ValueError(f"unsupported CQL type: {type_str}")
        elif col.frozen:
            # frozen<scalar> serializes identically to the scalar
            col.cql_type = inner
        if cm.group(3):
            col.kind = "static"
        if cm.group(4):
            inline_pk = name
        schema.columns.append(col)

    by_name = {c.name: c for c in schema.columns}
    if pk_spec is not None:
        partition, clustering = pk_spec[0], pk_spec[1:]
        for n in [_ident(x) for x in partition.split(",")]:
            by_name[n].kind = "partition_key"
        for n in clustering:
            by_name[_ident(n)].kind = "clustering"
    elif inline_pk:
        by_name[inline_pk].kind = "partition_key"
    else:
        raise ValueError("no PRIMARY KEY in CREATE TABLE")
    return schema


def _split_pk(spec: str) -> list[str]:
    """'(a, b), c, d' -> ['a, b', 'c', 'd'] (first element = partition)."""
    spec = spec.strip()
    if spec.startswith("("):
        close = spec.index(")")
        first = spec[1:close]
        rest = [s for s in spec[close + 1 :].split(",") if s.strip()]
        return [first] + rest
    parts = [s.strip() for s in spec.split(",")]
    return parts


# ---------------------------------------------------------------------------
# composite-name split + typed compose (JVM expressions)
# ---------------------------------------------------------------------------

_COMPS_DDL = "array<binary>"


def _static_cond(name: str) -> str:
    return f"length({name}) >= 2 AND hex(substring({name}, 1, 2)) = 'FFFF'"


def _split_expr(name_sql: str, max_components: int) -> str:
    """SQL string: split composite `name_sql` into an array<binary> of comps."""
    ln = f"cast(conv(hex(substring({name_sql}, acc.pos, 2)), 16, 10) as int)"
    return (
        f"aggregate(sequence(1, {max_components}), "
        f"struct(cast(if({_static_cond(name_sql)}, 3, 1) as int) as pos, "
        f"cast(array() as {_COMPS_DDL}) as arr), "
        f"(acc, i) -> if(acc.pos > length({name_sql}), acc, "
        f"struct(cast(acc.pos + 3 + {ln} as int) as pos, "
        f"array_append(acc.arr, substring({name_sql}, acc.pos + 2, {ln})) as arr)), "
        f"acc -> acc.arr)"
    )


def compose_value(b: Column, cql_type: str) -> Column:
    """binary -> typed Spark value per CQLMapper.addCqlValueToRecord.
    NULL in -> NULL out (absent cells stay null, CQLMapper.java:161-164)."""
    return F.when(b.isNotNull(), _compose_nonnull(b, cql_type))


def _compose_nonnull(b: Column, cql_type: str) -> Column:
    h = F.hex(b)
    if cql_type in ("text", "varchar", "ascii"):
        return b.cast("string")
    if cql_type in ("int", "bigint", "counter"):
        from .functions.casts import _width_decode

        v = _width_decode(F.lower(h))
        return v.cast("int") if cql_type == "int" else v
    if cql_type in ("uuid", "timeuuid"):
        lh = F.lower(h)
        return F.concat_ws(
            "-",
            F.substring(lh, 1, 8),
            F.substring(lh, 9, 4),
            F.substring(lh, 13, 4),
            F.substring(lh, 17, 4),
            F.substring(lh, 21, 12),
        )
    if cql_type == "timestamp":
        from .functions.casts import _width_decode

        return F.timestamp_millis(_width_decode(F.lower(h)))
    if cql_type == "double":
        from .functions.casts import hex_to_double

        return hex_to_double(F.lower(h))
    if cql_type == "float":
        from .functions.casts import hex_to_float

        return hex_to_float(F.lower(h))
    if cql_type == "boolean":
        return F.conv(h, 16, 10).cast("long") != 0
    if cql_type == "blob":
        return b
    if cql_type == "decimal":
        # i32 scale + any-width varint unscaled -> '<digits>E<-scale>'
        # built JVM-side (functions/bignum digitization, exact at any
        # width) and cast like the reference's BigDecimal; numerically
        # equal strings cast to equal decimal(38,18) values, so this
        # matches the former Python str(Decimal)-through-cast fallback.
        # Degenerate payloads (<= the 4-byte scale prefix) are NULL: empty
        # matches Cassandra's DecimalSerializer null-for-empty; 1-3-byte
        # blobs AND the exactly-4-byte shape (scale + EMPTY magnitude,
        # which BigInteger(byte[0]) throws on) map to NULL like the other
        # composes' malformed-width behavior (the old Python fallback
        # returned 0 for all of these; pinned by test_cql)
        from .functions.bignum import split_decimal

        scale, sign, digits = split_decimal(b)
        s = F.concat(sign, digits, F.lit("E"), (-scale).cast("string"))
        return F.when(F.length(b) >= 5, s.cast("decimal(38,18)"))
    raise ValueError(f"unsupported CQL type: {cql_type}")


# ---------------------------------------------------------------------------
# frozen-collection / tuple blob decode (Cassandra 2.1+ "version 3" wire
# format: i32 count / i32 element lengths; tuples are i32-length-prefixed
# components with -1 marking null). The reference delegates these types to
# Cassandra's QueryProcessor (CFMetadataUtility.java:12-38); here the blobs
# are unpacked with pure SQL expressions — JVM-side, no UDF.
# ---------------------------------------------------------------------------


def _i32_at(b_sql: str, pos_sql: str) -> str:
    """Signed big-endian i32 at 1-based byte position (SQL long expr)."""
    u = f"cast(conv(hex(substring({b_sql}, {pos_sql}, 4)), 16, 10) as long)"
    return f"(case when {u} >= 2147483648 then {u} - 4294967296 else {u} end)"


def _frozen_elems_expr(b_sql: str) -> str:
    """frozen<list|set>: blob -> array<binary> of element bytes."""
    n = _i32_at(b_sql, "1")
    ln = _i32_at(b_sql, "acc.pos")
    return (
        f"if({b_sql} is null or length({b_sql}) < 4, cast(null as {_COMPS_DDL}), "
        # NB sequence(1, 0) counts DOWN — guard the empty collection
        f"if({n} <= 0, cast(array() as {_COMPS_DDL}), "
        f"aggregate(sequence(1, cast({n} as int)), "
        f"struct(cast(5 as int) as pos, cast(array() as {_COMPS_DDL}) as arr), "
        f"(acc, i) -> struct(cast(acc.pos + 4 + {ln} as int) as pos, "
        f"array_append(acc.arr, substring({b_sql}, acc.pos + 4, {ln})) as arr), "
        f"acc -> acc.arr)))"
    )


def _frozen_entries_expr(b_sql: str) -> str:
    """frozen<map>: blob -> array<struct<k:binary, v:binary>>.

    SQL lambdas have no let-binding, so the key-length expression is
    inlined wherever the value offset needs it — verbose but JVM-side.
    """
    n = _i32_at(b_sql, "1")
    klen = _i32_at(b_sql, "acc.pos")
    vlen = _i32_at(b_sql, f"(acc.pos + 4 + {klen})")
    entries_ddl = "array<struct<k:binary, v:binary>>"
    return (
        f"if({b_sql} is null or length({b_sql}) < 4, cast(null as {entries_ddl}), "
        # NB sequence(1, 0) counts DOWN — guard the empty collection
        f"if({n} <= 0, cast(array() as {entries_ddl}), "
        f"aggregate(sequence(1, cast({n} as int)), "
        f"struct(cast(5 as int) as pos, cast(array() as {entries_ddl}) as arr), "
        f"(acc, i) -> struct("
        f"cast(acc.pos + 8 + {klen} + {vlen} as int) as pos, "
        f"array_append(acc.arr, struct("
        f"substring({b_sql}, acc.pos + 4, {klen}) as k, "
        f"substring({b_sql}, acc.pos + 8 + {klen}, {vlen}) as v)) as arr), "
        f"acc -> acc.arr)))"
    )


def _tuple_comps_expr(b_sql: str, n_comps: int) -> str:
    """tuple<...>: blob -> array<binary> of components; i32 length -1 (or a
    truncated blob) yields a null component."""
    ln = _i32_at(b_sql, "acc.pos")
    return (
        f"if({b_sql} is null, cast(null as {_COMPS_DDL}), "
        f"aggregate(sequence(1, {n_comps}), "
        f"struct(cast(1 as int) as pos, cast(array() as {_COMPS_DDL}) as arr), "
        f"(acc, i) -> if(acc.pos + 4 > length({b_sql}) + 1 OR {ln} < 0, "
        f"struct(cast(acc.pos + 4 as int) as pos, "
        f"array_append(acc.arr, cast(null as binary)) as arr), "
        f"struct(cast(acc.pos + 4 + {ln} as int) as pos, "
        f"array_append(acc.arr, substring({b_sql}, acc.pos + 4, {ln})) as arr)), "
        f"acc -> acc.arr))"
    )


def _timeuuid_sort_key(h: Column) -> Column:
    """hex(timeuuid) -> string ordered by embedded time (version nibble is
    constant for v1 uuids): time_hi, time_mid, time_low."""
    return F.concat(F.substring(h, 13, 4), F.substring(h, 9, 4), F.substring(h, 1, 8))


# ---------------------------------------------------------------------------
# the transform
# ---------------------------------------------------------------------------


def cql_rows(compacted: DataFrame, ddl: str | CqlSchema) -> DataFrame:
    """Compacted rows -> wide typed CQL rows (one per clustering group).

    Expects ``compact()`` output (ideally after ``cleanse()``); composite
    cell names are split JVM-side, values composed per the schema, list
    collections gathered time-ordered, statics broadcast over the partition.
    """
    schema = parse_create_table(ddl) if isinstance(ddl, str) else ddl
    n_ck = len(schema.clustering)
    # components: clustering... , column name, optional collection key
    max_comps = n_ck + 2

    cells = compacted.select(
        "partition_key",
        "deleted_at",
        F.explode("columns").alias("c"),
    ).filter(
        # live cells only (post-cleanse): columns, expiring columns, and
        # counters — dropping 'x' would silently NULL every counter column
        # while CQL_TYPES advertises counter support
        F.col("c.kind").isin("c", "e", "x")
    )

    comps = F.expr(_split_expr("c.name", max_comps))
    cells = cells.select(
        "partition_key",
        comps.alias("comps"),
        F.expr(_static_cond("c.name")).alias("is_static"),
        F.col("c.value").alias("value"),
        F.col("c.ts").alias("ts"),
    ).withColumn(
        "colname", F.try_element_at("comps", F.lit(n_ck + 1)).cast("string")
    ).withColumn(
        "collkey", F.try_element_at("comps", F.lit(n_ck + 2))
    )

    # partition key components
    pks = schema.partition_keys
    if len(pks) == 1:
        pk_cols = [compose_value(F.col("partition_key"), pks[0].cql_type).alias(pks[0].name)]
    else:
        pk_split = F.expr(_split_expr("partition_key", len(pks)))
        pk_cols = [
            compose_value(F.try_element_at(pk_split, F.lit(i + 1)), c.cql_type).alias(c.name)
            for i, c in enumerate(pks)
        ]

    ck_cols = [
        F.when(~F.col("is_static"), F.try_element_at("comps", F.lit(i + 1))).alias(f"__ck{i}")
        for i in range(n_ck)
    ]

    grouped = (
        cells.select("partition_key", "is_static", "colname", "collkey", "value", "ts", "comps")
        .withColumns({f"__ck{i}": c for i, c in enumerate(ck_cols)})
        .groupBy("partition_key", "is_static", *[f"__ck{i}" for i in range(n_ck)])
    )

    aggs = []
    for col in schema.regulars + schema.statics:
        cond = F.col("colname") == col.name
        if col.frozen:
            # frozen collections/tuples live in ONE cell blob -> scalar LWW
            aggs.append(
                F.max_by(F.when(cond, F.col("value")), F.when(cond, F.col("ts"))).alias(
                    f"__raw_{col.name}"
                )
            )
        elif col.collection == "list":
            aggs.append(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                cond & F.col("collkey").isNotNull(),
                                F.struct(
                                    _timeuuid_sort_key(F.hex(F.col("collkey"))).alias("k"),
                                    F.col("value").alias("v"),
                                ),
                            )
                        )
                    ),
                    lambda s: s.getField("v"),
                ).alias(f"__raw_{col.name}")
            )
        elif col.collection in ("set", "map"):
            # set: element bytes live in the collection key; map: key+value
            aggs.append(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            cond & F.col("collkey").isNotNull(),
                            F.struct(F.col("collkey").alias("k"), F.col("value").alias("v")),
                        )
                    )
                ).alias(f"__raw_{col.name}")
            )
        else:
            aggs.append(
                F.max_by(F.when(cond, F.col("value")), F.when(cond, F.col("ts"))).alias(
                    f"__raw_{col.name}"
                )
            )
    rows = grouped.agg(*aggs)

    # statics: broadcast each partition's static row onto its regular rows
    if schema.statics:
        w = Window.partitionBy("partition_key")
        for col in schema.statics:
            rows = rows.withColumn(
                f"__raw_{col.name}",
                F.first(
                    F.when(F.col("is_static"), F.col(f"__raw_{col.name}")), ignorenulls=True
                ).over(w),
            )
        rows = rows.withColumn(
            "__n_regular", F.count(F.when(~F.col("is_static"), F.lit(1))).over(w)
        ).filter(~F.col("is_static") | (F.col("__n_regular") == 0))

    out_cols = list(pk_cols)
    for i, c in enumerate(schema.clustering):
        out_cols.append(compose_value(F.col(f"__ck{i}"), c.cql_type).alias(c.name))
    for col in schema.regulars + schema.statics:
        raw = F.col(f"__raw_{col.name}")
        if col.frozen:
            raw_sql = f"`__raw_{col.name}`"
            if col.collection == "tuple":
                comps = F.expr(_tuple_comps_expr(raw_sql, len(col.tuple_types)))
                out_cols.append(
                    F.when(
                        raw.isNotNull(),
                        F.struct(*[
                            compose_value(
                                F.try_element_at(comps, F.lit(i + 1)), t
                            ).alias(f"f{i}")
                            for i, t in enumerate(col.tuple_types)
                        ]),
                    ).alias(col.name)
                )
            elif col.collection in ("list", "set"):
                elem = col.element_type or "blob"
                elems = F.expr(_frozen_elems_expr(raw_sql))
                out_cols.append(
                    F.transform(elems, lambda v: compose_value(v, elem)).alias(col.name)
                )
            elif col.collection == "map":
                kt = col.element_type or "blob"
                vt = col.value_type or "blob"
                entries = F.expr(_frozen_entries_expr(raw_sql))
                out_cols.append(
                    F.map_from_entries(
                        F.transform(
                            entries,
                            lambda s: F.struct(
                                compose_value(s.getField("k"), kt).alias("k"),
                                compose_value(s.getField("v"), vt).alias("v"),
                            ),
                        )
                    ).alias(col.name)
                )
            else:
                # frozen<scalar>: identical wire format to the scalar
                out_cols.append(compose_value(raw, col.cql_type).alias(col.name))
            continue
        nonempty = F.when(F.size(raw) > 0, raw)  # absent collection -> NULL
        if col.collection == "list":
            elem = col.element_type or "blob"
            out_cols.append(
                F.transform(nonempty, lambda v: compose_value(v, elem)).alias(col.name)
            )
        elif col.collection == "set":
            elem = col.element_type or "blob"
            out_cols.append(
                F.transform(nonempty, lambda s: compose_value(s.getField("k"), elem)).alias(col.name)
            )
        elif col.collection == "map":
            kt = col.element_type or "blob"
            vt = col.value_type or "blob"
            out_cols.append(
                F.map_from_entries(
                    F.transform(
                        nonempty,
                        lambda s: F.struct(
                            compose_value(s.getField("k"), kt).alias("k"),
                            compose_value(s.getField("v"), vt).alias("v"),
                        ),
                    )
                ).alias(col.name)
            )
        else:
            out_cols.append(compose_value(raw, col.cql_type).alias(col.name))

    # in-partition order only: a global orderBy would add a range Exchange
    # + full sort of the entire export for cosmetic total order the sinks
    # don't need (the reference mapper emits unordered); callers that want
    # total order sort the (much smaller) result themselves
    order = [c.name for c in pks] + [c.name for c in schema.clustering]
    return rows.select(*out_cols).sortWithinPartitions(*order)
