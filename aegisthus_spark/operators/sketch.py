"""Distinct-count sketching: stochastic-averaged minimum-value estimator
(Flajolet-Martin / KMV family, Bar-Yossef et al. 2002).

The sketch state per group is ``m`` doubles (one minimum normalized hash
per register), built with plain MIN aggregates — fully map-side
combinable, bounded memory, mergeable across partitions/batches, which is
exactly what a 100 TB cardinality rollup needs (a COUNT(DISTINCT) at that
scale shuffles every distinct value; this shuffles m values per group).

Hashing: each value maps to 32 bits (md5 prefix — deterministic and
engine-agnostic, same family as dedup.H32); the low ``log2(m)`` bits pick
a register, the remaining bits normalize to u in (0, 1]. Estimator: with
n distinct values spread over m registers, each register minimum is
~ Beta(1, n/m) ~ Exp(n/m) and their sum S ~ Gamma(m, scale m/(n+m)), so
1/S is inverse-Gamma with mean (n+m)/(m*(m-1)); the unbiased-corrected
estimate is  n^ = m*(m-1)/S - m.  Registers no value hashed into
contribute u = 1 (the min of zero uniforms for estimation purposes).
For the small-n regime (n^ < 2.5m with V > 0 empty registers) the
estimator switches to linear counting  m*ln(m/V)  — the same two-regime
scheme HyperLogLog uses (Flajolet et al. 2007 / Heule et al. 2013).
Relative error ~ 1/sqrt(m): ~6% at the default m=256 (2 KiB of state
per group).

Everything is integer / fixed-order arithmetic, so a DuckDB oracle
reproduces the estimate BIT-FOR-BIT — unlike approx_count_distinct, whose
HLL sketch is engine-private. The register sum runs in DECIMAL(27,15)
(order-independent) before the final double division.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import H32

#: registers; error ~ 1/sqrt(m) ~ 6% (state: 256 doubles/group)
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
    space = float((1 << 32) // m)
    h = H32.format(col=f"cast({value_col} as string)")
    hashed = df.select(
        *key_cols,
        F.expr(f"{h} % {m}").alias("_reg"),
        # integer div (exact floor) for the value bits, mirroring DuckDB //
        F.expr(f"(cast({h} div {m} as double) + 1.0) / {space!r}").alias("_u"),
    )
    regs = hashed.groupBy(*key_cols, "_reg").agg(F.min("_u").alias("_umin"))
    # S = sum of present-register minima + 1.0 per EMPTY register; V = empties
    s = (
        F.sum(F.col("_umin").cast("decimal(27,15)"))
        + (F.lit(m) - F.count(F.lit(1))).cast("decimal(27,15)")
    ).cast("double")
    v = (F.lit(m) - F.count(F.lit(1))).cast("double")
    raw = F.lit(float(m * (m - 1))) / s - F.lit(float(m))
    lin = F.lit(float(m)) * F.log(F.lit(float(m)) / v)
    return regs.groupBy(*key_cols).agg(
        F.round(
            F.when((v > 0) & (raw < 2.5 * m), lin).otherwise(raw), 2
        ).alias("distinct_est")
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
    agg AS (
      SELECT {keys},
             {float(m * (m - 1))!r} / CAST(
                 SUM(CAST(umin AS DECIMAL(27,15)))
                 + CAST({m} - COUNT(*) AS DECIMAL(27,15)) AS DOUBLE)
               - {float(m)!r} AS raw,
             CAST({m} - COUNT(*) AS DOUBLE) AS v
      FROM regs GROUP BY {keys}),
    sketch AS (
      SELECT {keys},
             round(CASE WHEN v > 0 AND raw < 2.5 * {m}
                        THEN {float(m)!r} * ln({float(m)!r} / v)
                        ELSE raw END, 2) AS distinct_est
      FROM agg)
    """""
