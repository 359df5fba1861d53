"""Distinct-count sketching: occupancy-corrected minimum-value estimator
(Flajolet-Martin / KMV family, Bar-Yossef et al. 2002).

The sketch state per group is ``m`` doubles (one minimum normalized hash
per register), built with plain MIN aggregates — fully map-side
combinable, bounded memory, mergeable across partitions/batches, which is
exactly what a 100 TB cardinality rollup needs (a COUNT(DISTINCT) at that
scale shuffles every distinct value; this shuffles m values per group).

Hashing: each value maps to 32 bits (md5 prefix — deterministic and
engine-agnostic, same family as dedup.H32); the low ``log2(m)`` bits pick
a register, the remaining bits normalize to u in (0, 1]. Estimator: with
the n distinct values Poissonized over m registers at rate L = n/m,
 E[1/(N+1)] = (1 - e^-L)/L  for N ~ Poisson(L), and a register minimum
has E[U | N] = 1/(N+1) with the empty-register convention U = 1 matching
the N = 0 term exactly — so  E[S] = m(1 - e^-L)/L. The empty-register
count V estimates m e^-L, giving the closed form

    n^ = (m-1) * (m - V) / S

((m-1) for the usual 1/S inverse correction; V = m implies S = m and the
formula lands on 0 with no special case). Measured bias <= ~1% across
n = 15..100k at m = 256 with ~6% (1/sqrt(m)) relative std — no
small-range regime switch needed, unlike the naive m(m-1)/S - m form,
which biases 10-25% low around n ~ 2.5m-10m.

Everything is integer / fixed-order arithmetic, so a DuckDB oracle
reproduces the estimate BIT-FOR-BIT — unlike approx_count_distinct, whose
HLL sketch is engine-private. The register sum runs in DECIMAL(27,15)
(order-independent) before the final double division.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import H32

#: registers; relative std ~ 1/sqrt(m) ~ 6% (state: 256 doubles/group)
M_REGISTERS = 256


def distinct_sketch(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    *,
    m: int = M_REGISTERS,
) -> DataFrame:
    """(key..., distinct_est): deterministic distinct-count estimate.

    Two hash-aggregates: (key, register) -> MIN(u), then key -> register
    sum + estimate. Both have map-side partial aggregation; state is m
    doubles per group at every stage.
    """
    regs = sketch_registers(df, key_cols, value_col, m=m)
    return sketch_estimate(regs, key_cols, m=m)


def sketch_registers(
    df: DataFrame, key_cols: list[str], value_col: str, *, m: int = M_REGISTERS
) -> DataFrame:
    """Stage 1 — (key..., _reg, _umin): per-register minimum normalized
    hash. This IS the sketch state: a plain MIN aggregate, mergeable by
    further MIN, so it runs identically as a batch groupBy or a streaming
    cumulative aggregate (state bounded at m doubles per group by
    construction — no watermark needed, which is the whole point of
    sketching a stream)."""
    space = float((1 << 32) // m)
    h = H32.format(col=f"cast({value_col} as string)")
    hashed = df.select(
        *key_cols,
        F.expr(f"{h} % {m}").alias("_reg"),
        # integer div (exact floor) for the value bits, mirroring DuckDB //
        F.expr(f"(cast({h} div {m} as double) + 1.0) / {space!r}").alias("_u"),
    )
    return hashed.groupBy(*key_cols, "_reg").agg(F.min("_u").alias("_umin"))


def sketch_estimate(
    regs: DataFrame, key_cols: list[str], *, m: int = M_REGISTERS
) -> DataFrame:
    """Stage 2 — fold register state into (key..., distinct_est)."""
    # S = sum of present-register minima + 1.0 per EMPTY register; V = empties
    s = (
        F.sum(F.col("_umin").cast("decimal(27,15)"))
        + (F.lit(m) - F.count(F.lit(1))).cast("decimal(27,15)")
    ).cast("double")
    v = (F.lit(m) - F.count(F.lit(1))).cast("double")
    return regs.groupBy(*key_cols).agg(
        F.round(F.lit(float(m - 1)) * (F.lit(float(m)) - v) / s, 2).alias(
            "distinct_est"
        )
    )


def distinct_sketch_oracle_cte(
    table: str, key_cols: list[str], value_col: str, *, m: int = M_REGISTERS
) -> str:
    """DuckDB CTE fragment ending in a ``sketch`` relation computing the
    identical estimate (same hash, same register split, same decimal
    register sum). Compose as ``WITH {cte} SELECT ... FROM sketch``."""
    keys = ", ".join(key_cols)
    space = float((1 << 32) // m)
    h32 = f"CAST(CONCAT('0x', SUBSTR(md5(CAST({value_col} AS VARCHAR)), 1, 8)) AS BIGINT)"
    return f"""
    hashed AS (
      SELECT {keys}, {h32} % {m} AS reg,
             (CAST({h32} // {m} AS DOUBLE) + 1.0) / {space!r} AS u
      FROM {table}),
    regs AS (SELECT {keys}, reg, MIN(u) AS umin FROM hashed GROUP BY {keys}, reg),
    sketch AS (
      SELECT {keys},
             round({float(m - 1)!r}
                   * ({float(m)!r} - CAST({m} - COUNT(*) AS DOUBLE))
                   / CAST(SUM(CAST(umin AS DECIMAL(27,15)))
                          + CAST({m} - COUNT(*) AS DECIMAL(27,15)) AS DOUBLE),
                   2) AS distinct_est
      FROM regs GROUP BY {keys})
    """


# ---------------------------------------------------------------------------
# HyperLogLog: log-space register distinct counting (Flajolet et al. 2007)
# ---------------------------------------------------------------------------

#: registers (b = 8 bucket bits); relative std ~ 1.04/sqrt(m) ~ 6.5%.
#: State per group: m SMALL INTS (a rho in 0..25) vs KMV's m doubles —
#: the reason HLL is the industry default at 100 TB: a full per-group
#: sketch is ~256 bytes, mergeable by elementwise MAX.
HLL_M = 256

#: value bits left of the 32-bit hash after the register split
_HLL_VALUE_BITS = 24

#: standard bias constant for m >= 128
_HLL_ALPHA = 0.7213 / (1.0 + 1.079 / HLL_M)


def _rho_expr(w: str, bits: int = _HLL_VALUE_BITS) -> str:
    """SQL: rank of the leftmost 1-bit of ``w`` within a ``bits``-wide
    word, 1-based from the MSB; w = 0 -> bits + 1 (Flajolet's rho). A
    pure integer CASE cascade — no float log2 whose boundary rounding
    could differ between engines."""
    cases = " ".join(
        f"WHEN {w} >= {1 << (bits - k)} THEN {k}" for k in range(1, bits + 1)
    )
    return f"(CASE {cases} ELSE {bits + 1} END)"


def hll_registers(
    df: DataFrame, key_cols: list[str], value_col: str, *, m: int = HLL_M
) -> DataFrame:
    """Stage 1 — (key..., _reg, _rhomax): per-register max leading-zero
    rank. Same md5-split as the KMV sketch (low log2(m) bits pick the
    register, the remaining 24 bits carry the value); a plain MAX
    aggregate, map-side combinable and mergeable across partitions,
    batches, or streaming increments."""
    h = H32.format(col=f"cast({value_col} as string)")
    return df.select(
        *key_cols,
        F.expr(f"{h} % {m}").alias("_reg"),
        F.expr(_rho_expr(f"({h} div {m})")).alias("_rho"),
    ).groupBy(*key_cols, "_reg").agg(F.max("_rho").alias("_rhomax"))


def hll_estimate(
    regs: DataFrame, key_cols: list[str], *, m: int = HLL_M
) -> DataFrame:
    """Stage 2 — harmonic-mean estimate with the standard small-range
    switch to linear counting.

    The register sum runs in EXACT integers: sum_j 2^-M_j is scaled by
    2^(bits+1) so every term 2^(bits+1-rho) is a whole number (empty
    registers contribute the M_j = 0 term, 2^(bits+1)) — an
    order-independent sum, so the estimate is bit-identical in any
    engine. raw = alpha * m^2 * 2^(bits+1) / S; below 2.5m with empty
    registers present, linear counting m*ln(m/V) is the better estimator
    (Flajolet et al. 2007 S4). No 32-bit large-range correction: the
    md5 prefix is uniform and these corpora sit far below 2^32/30."""
    top = 1 << (_HLL_VALUE_BITS + 1)
    s = (
        F.sum(F.expr(f"shiftleft(cast(1 as bigint), {_HLL_VALUE_BITS + 1} - _rhomax)"))
        + (F.lit(m) - F.count(F.lit(1))).cast("bigint") * F.lit(top)
    ).cast("double")
    v = (F.lit(m) - F.count(F.lit(1))).cast("double")
    raw = F.lit(_HLL_ALPHA * m * m * top) / s
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (v > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / v),
    ).otherwise(raw)
    return regs.groupBy(*key_cols).agg(F.round(est, 2).alias("hll_est"))


def hll_sketch(
    df: DataFrame, key_cols: list[str], value_col: str, *, m: int = HLL_M
) -> DataFrame:
    """(key..., hll_est): deterministic HyperLogLog distinct estimate."""
    return hll_estimate(hll_registers(df, key_cols, value_col, m=m), key_cols, m=m)


def hll_oracle_cte(
    table: str, key_cols: list[str], value_col: str, *, m: int = HLL_M
) -> str:
    """DuckDB CTE fragment ending in a ``hll`` relation with the identical
    estimate (same hash split, same integer register sum, same
    small-range switch). Compose as ``WITH {cte} SELECT ... FROM hll``."""
    keys = ", ".join(key_cols)
    bits = _HLL_VALUE_BITS
    top = 1 << (bits + 1)
    h32 = f"CAST(CONCAT('0x', SUBSTR(md5(CAST({value_col} AS VARCHAR)), 1, 8)) AS BIGINT)"
    rho = _rho_expr(f"({h32} // {m})", bits)
    return f"""
    hhash AS (
      SELECT {keys}, {h32} % {m} AS reg, {rho} AS rho FROM {table}),
    hregs AS (SELECT {keys}, reg, MAX(rho) AS rhomax
              FROM hhash GROUP BY {keys}, reg),
    hll AS (
      SELECT {keys},
             round(CASE WHEN raw <= {2.5 * m!r} AND v > 0
                        THEN {float(m)!r} * ln({float(m)!r} / v)
                        ELSE raw END, 2) AS hll_est
      FROM (
        SELECT {keys},
               CAST({m} - COUNT(*) AS DOUBLE) AS v,
               {_HLL_ALPHA * m * m * top!r}
               / CAST(SUM(1::BIGINT << ({bits + 1} - rhomax))
                      + ({m} - COUNT(*))::BIGINT * {top} AS DOUBLE) AS raw
        FROM hregs GROUP BY {keys})
      )
    """


# ---------------------------------------------------------------------------
# Count-min sketch: frequency estimation / heavy hitters
# ---------------------------------------------------------------------------

#: depth (independent hash rows) x width (buckets per row). State per
#: sketch: d*w counters — 8192 longs (64 KB) here — mergeable by plain
#: addition. Width sets the collision noise floor (~stream_count/w per
#: bucket before the min-of-d); hitters below it are not recoverable.
CMS_D = 4
CMS_W = 2048


def _md5_word_mod(j: int, key_expr: str, m: int) -> str:
    """Spark SQL expr: word ``j`` of md5(key) mod ``m`` — the shared
    bucket/bit-position arithmetic of the CMS and Bloom builds.

    All j < 4 hash rows come from ONE md5 digest — row j reads hex chars
    [8j+1, 8j+8] of the 32-char digest as its 32-bit hash. One digest per
    row instead of four: the md5 is the dominant per-row cost of a sketch
    build (measured 4x on the stress bench), and the four words of a
    digest are independent for bucketing purposes."""
    if not 0 <= j < 4:  # not assert: must survive python -O, else the
        # substring runs past the 32-char digest and yields NULL buckets
        raise ValueError(f"md5 yields four 32-bit words; j < 4 (got row {j})")
    return (
        f"cast(conv(substring(md5(cast({key_expr} as string)), {8 * j + 1}, 8),"
        f" 16, 10) as bigint) % {m}"
    )


def _cms_bucket(j: int, key_expr: str, w: int) -> str:
    """Bucket of ``key_expr`` under CMS hash row ``j``."""
    return _md5_word_mod(j, key_expr, w)


def cms_heavy_hitters(
    df: DataFrame,
    key_col: str,
    *,
    d: int = CMS_D,
    w: int = CMS_W,
    k: int = 20,
) -> DataFrame:
    """(key, est_count): top-``k`` keys by count-min-sketch estimate
    (Cormode & Muthukrishnan 2005).

    Build: every row lands in one bucket per hash row — an explode to
    (row j, bucket) followed by ONE hash-aggregate whose map-side partial
    state is at most d*w counters per task, so the shuffle carries sketch
    fragments, not the key stream. That bounded-state merge is the whole
    point at 100 TB: counting exact per-key frequencies shuffles every
    key; the sketch shuffles d*w longs per partition regardless of
    cardinality.

    Estimate: est(x) = min_j sketch[j][h_j(x)] — an overestimate, never
    under (each counter only ever adds collisions). The candidate keys
    here are the distinct keys themselves (at scale: per-partition local
    heavy hitters); the d*w sketch broadcasts to the candidate join.

    Everything is integer arithmetic on the md5-prefix hash, so a DuckDB
    oracle reproduces the estimates exactly.
    """
    sketch = (
        _cms_coords(df, key_col, d=d, w=w)
        .groupBy("j", "b")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return cms_estimate_topk(sketch, df, key_col, d=d, w=w, k=k)


def _cms_coords(src: DataFrame, key_col: str, *, d: int, w: int) -> DataFrame:
    """(key, j, b): the d sketch coordinates of every row's key."""
    return src.select(
        F.col(key_col).alias("_k"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"),
                        F.expr(_cms_bucket(j, key_col, w)).alias("b"),
                    )
                    for j in range(d)
                ]
            )
        ).alias("jb"),
    ).select("_k", F.col("jb.j").alias("j"), F.col("jb.b").alias("b"))


def cms_estimate_topk(
    sketch: DataFrame,
    candidates: DataFrame,
    key_col: str,
    *,
    d: int = CMS_D,
    w: int = CMS_W,
    k: int = 20,
) -> DataFrame:
    """Fold a (j, b, c) sketch — batch-built or drained from a stream —
    into top-``k`` (key, est_count) for the candidate keys."""
    # candidates: distinct keys FIRST (one shuffle of keys), then the d
    # hash coordinates per distinct key — not a distinct over the d-times
    # larger exploded stream. LEFT join + coalesce(0): a candidate bucket
    # no stream row ever touched is a ZERO counter (true CMS semantics) —
    # an inner join would inflate or drop candidates absent from the
    # sketched stream (e.g. a watchlist key that never occurred).
    cand = _cms_coords(candidates.select(key_col).distinct(), key_col, d=d, w=w)
    est = (
        cand.join(F.broadcast(sketch), ["j", "b"], "left")
        .groupBy("_k")
        .agg(F.min(F.coalesce("c", F.lit(0))).alias("est_count"))
    )
    return (
        est.select(F.col("_k").alias(key_col), "est_count")
        .orderBy(F.desc("est_count"), key_col)
        .limit(k)
    )


def cms_oracle_cte(table: str, key_col: str, *, d: int = CMS_D, w: int = CMS_W) -> str:
    """DuckDB CTE fragment ending in an ``est`` relation with the identical
    count-min estimates. Compose as ``WITH {cte} SELECT ... FROM est``."""
    h = (
        f"CAST(CONCAT('0x', SUBSTR(md5(CAST({key_col} AS VARCHAR)),"
        f" CAST(1 + 8 * j AS INT), 8)) AS BIGINT)"
    )
    return f"""
    coords AS (
      SELECT {key_col} AS k, j, {h} % {w} AS b
      FROM {table}, (SELECT unnest(range({d})) AS j)),
    sketch AS (SELECT j, b, COUNT(*) AS c FROM coords GROUP BY j, b),
    cand AS (SELECT DISTINCT k, j, b FROM coords),
    est AS (
      SELECT k, MIN(COALESCE(c, 0)) AS est_count
      FROM cand LEFT JOIN sketch USING (j, b) GROUP BY k)
    """


# ---------------------------------------------------------------------------
# Bloom filter: mergeable membership sketch (Bloom 1970)
# ---------------------------------------------------------------------------
#: default geometry: 16384 bits over 63-bit words (sign-safe shifts in
#: BOTH engines: DuckDB/Java 1<<63 would wrap negative), k=4 hash rows
#: from ONE md5 digest (same trick as the CMS — the digest's four 32-bit
#: words are independent for bucketing)
BLOOM_M = 16384
BLOOM_K = 4
_BLOOM_WORD = 63


def _bloom_pos(j: int, key_expr: str, m: int) -> str:
    """SQL expr: bit position of ``key_expr`` under hash row ``j < 4``."""
    return _md5_word_mod(j, key_expr, m)


def bloom_build(
    df: DataFrame, key_col: str, *, m: int = BLOOM_M, k: int = BLOOM_K
) -> DataFrame:
    """(w, bits): Bloom filter over ``key_col`` as ceil(m/63) 63-bit words.

    Build is one explode + one hash-aggregate whose map-side partial
    state is at most ceil(m/63) longs per task — the shuffle carries
    sketch fragments, never the key stream, and shard sketches merge
    with a further BIT_OR (the same property the CMS/KMV builds have).
    At 100 TB this is the membership analog of the CMS: a set-membership
    pre-filter (decontamination, cross-corpus dedup) with bounded state
    and NO false negatives; false-positive rate ~ (1 - e^{-kn/m})^k.
    """
    pos = F.explode(
        F.array(*[F.expr(_bloom_pos(j, key_col, m)) for j in range(k)])
    ).alias("pos")
    return (
        df.select(pos)
        .select(
            F.expr(f"pos div {_BLOOM_WORD}").alias("w"),
            # expr form: the pyspark shiftleft wrapper wants a LITERAL bit
            # count, not a Column
            F.expr(
                f"shiftleft(cast(1 as bigint), cast(pos % {_BLOOM_WORD} as int))"
            ).alias("bit"),
        )
        .groupBy("w")
        .agg(F.expr("bit_or(bit)").alias("bits"))
    )


def bloom_probe(
    df: DataFrame,
    key_col: str,
    sketch: DataFrame,
    *,
    m: int = BLOOM_M,
    k: int = BLOOM_K,
    id_col: str | None = None,
) -> DataFrame:
    """(id, is_member): Bloom membership per row of ``df``.

    The sketch is word-rows (tiny: ceil(m/63) longs) and BROADCASTS to
    the probe join; each probe row contributes k (position, word) lookups
    and is a member iff every looked-up bit is set. Missing words (never
    built) read as zero via the left join.
    """
    out_id = id_col or key_col
    pos = F.explode(
        F.array(*[F.expr(_bloom_pos(j, key_col, m)) for j in range(k)])
    ).alias("pos")
    probes = df.select(F.col(out_id).alias("_pid"), pos).select(
        "_pid",
        F.expr(f"pos div {_BLOOM_WORD}").alias("w"),
        (F.col("pos") % _BLOOM_WORD).cast("int").alias("b"),
    )
    hit = (
        F.expr("shiftright(coalesce(bits, cast(0 as bigint)), b)") % 2
    ).alias("hit")
    return (
        probes.join(F.broadcast(sketch), "w", "left")
        .select("_pid", hit)
        .groupBy("_pid")
        .agg((F.min("hit") == 1).alias("is_member"))
        .select(F.col("_pid").alias(out_id), "is_member")
    )


def bloom_oracle_cte(
    table: str, key_expr: str, *, probe_id_expr: str,
    m: int = BLOOM_M, k: int = BLOOM_K, member_filter: str = "TRUE",
) -> str:
    """DuckDB CTE chain ending in ``probe_hits`` (pid, is_member) that
    reproduces bloom_build + bloom_probe bit-for-bit (same md5 word
    arithmetic, same 63-bit words): the filter rows matching
    ``member_filter`` build the sketch on ``key_expr``; EVERY row probes
    with id ``probe_id_expr``."""
    pos_list = ", ".join(
        f"CAST(CAST('0x' || substring(md5(CAST({key_expr} AS VARCHAR)), {8 * j + 1}, 8) AS BIGINT) % {m} AS BIGINT)"
        for j in range(k)
    )
    return f"""
    built AS (
      SELECT u.pos // {_BLOOM_WORD} AS w,
             bit_or(CAST(1 AS BIGINT) << CAST(u.pos % {_BLOOM_WORD} AS INT)) AS bits
      FROM (SELECT unnest([{pos_list}]) AS pos
            FROM {table} WHERE {member_filter}) u
      GROUP BY 1),
    probes AS (
      SELECT {probe_id_expr} AS pid, unnest([{pos_list}]) AS pos
      FROM {table}),
    probe_hits AS (
      SELECT p.pid,
             min((COALESCE(b.bits, 0) >> CAST(p.pos % {_BLOOM_WORD} AS INT)) % 2) = 1
               AS is_member
      FROM probes p LEFT JOIN built b ON b.w = p.pos // {_BLOOM_WORD}
      GROUP BY p.pid)"""
