"""Corpus-curation operators for training-data pipelines: deterministic
dataset splitting and token-budget sequence packing.

Scale design notes (100 TB):
- Splitting is a pure per-row expression over a content-stable hash — no
  RNG state, no shuffle, no driver coordination; any engine (and any rerun,
  on any partitioning) assigns every document the same split. Stratification
  falls out of hashing per-document rather than per-partition.
- Packing is the DISTRIBUTED formulation: exact greedy first-fit-decreasing
  is inherently sequential, so the pipeline-standard shape is a cumulative
  token sum per stratum (one partitioned window, one shuffle on the stratum
  key) chunked into fixed budgets. Documents longer than the budget get a
  pack of their own (they would be truncated/split downstream either way).
  Pack ids are deterministic given the (stratum, order) — reruns and
  engines agree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: 32-bit hash bucket count for split assignment; the md5-prefix hash is the
#: same engine-agnostic construction the dedup operators use (dedup.H32)
_SPLIT_BUCKETS = 10_000


def split_assign(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    fractions: tuple[float, float] = (0.8, 0.1),  # train, val; rest = test
    salt: str = "split-v1",
) -> DataFrame:
    """(id, bucket, split): deterministic train/val/test assignment.

    The bucket is ``h32(salt || id) mod 10000``; fraction boundaries cut the
    bucket space. Content-stable: adding or removing OTHER documents never
    moves an existing document across splits (unlike sortBy+limit sampling),
    which is what makes incremental corpus refreshes reproducible.
    """
    from .dedup import H32

    train_hi = int(fractions[0] * _SPLIT_BUCKETS)
    val_hi = train_hi + int(fractions[1] * _SPLIT_BUCKETS)
    bucket = F.expr(
        H32.format(col=f"concat('{salt}', cast({id_col} as string))")
        + f" % {_SPLIT_BUCKETS}"
    )
    return docs.select(
        F.col(id_col),
        bucket.cast("int").alias("bucket"),
        F.when(bucket < train_hi, "train")
        .when(bucket < val_hi, "val")
        .otherwise("test")
        .alias("split"),
    )


def pack_sequences(
    docs: DataFrame,
    *,
    budget: int = 2048,
    id_col: str = "doc_id",
    text_col: str = "text",
    stratum_col: str = "lang",
) -> DataFrame:
    """(id, stratum, n_tokens, pack_id, pack_offset): assign documents to
    fixed token-budget training sequences.

    Within each stratum, documents are ordered by id (deterministic), the
    token counts are cumulatively summed, and the running total is chunked
    into ``budget``-sized packs: ``pack_id = floor((cumsum - n) / budget)``
    — i.e. a document starts the pack its first token lands in. This is the
    declarative analog of streaming concatenate-and-cut packing (documents
    may straddle a boundary; downstream chunking splits them).

    Strata are fact-scale (one language can hold most of a corpus), so the
    cumulative sum uses :func:`..ranking.global_running_sum` — range
    partition + local window + broadcast offsets — NOT a plain
    ``Window.partitionBy(stratum)``, which would funnel each stratum
    through a single task.
    """
    from .ranking import global_running_sum

    toks = docs.select(
        F.col(id_col),
        F.col(stratum_col).alias("stratum"),
        F.size(F.split(F.col(text_col), " ")).alias("n_tokens"),
    )
    cum = global_running_sum(
        toks, ["stratum"], [F.col(id_col)], "n_tokens", out_col="cum"
    )
    return cum.select(
        id_col,
        "stratum",
        "n_tokens",
        F.floor((F.col("cum") - F.col("n_tokens")) / budget).cast("int").alias("pack_id"),
        ((F.col("cum") - F.col("n_tokens")) % budget).cast("int").alias("pack_offset"),
    )


def sample_balanced(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    stratum_col: str = "lang",
    salt: str = "balance-v1",
) -> DataFrame:
    """Deterministic stratum-balanced downsampling: keep each stratum at
    (approximately) the size of the SMALLEST stratum — the standard
    language-rebalancing step before training-mix assembly.

    Per-stratum keep fraction = min_count / stratum_count, applied through
    the same content-stable hash bucket as :func:`split_assign`, compared
    with integer cross-multiplication (``bucket * count < min_count *
    BUCKETS``) so no float threshold ever enters — any engine keeps the
    exact same documents.

    Scale shape: the stratum census is one tiny aggregate (|strata| rows)
    joined back as a broadcast; the keep decision is then a pure per-row
    expression. No fact-table shuffle at any corpus size, and adding or
    removing documents in one stratum never reshuffles which documents
    another stratum keeps (only its own threshold).
    """
    from .dedup import H32

    counts = docs.groupBy(stratum_col).agg(F.count(F.lit(1)).alias("_n_str"))
    floor_ = counts.agg(F.min("_n_str").alias("_n_min"))
    thresholds = counts.crossJoin(F.broadcast(floor_))
    bucket = F.expr(
        H32.format(col=f"concat('{salt}', cast({id_col} as string))")
        + f" % {_SPLIT_BUCKETS}"
    )
    return (
        docs.withColumn("_bucket", bucket)
        .join(F.broadcast(thresholds), stratum_col)
        .filter(
            F.col("_bucket") * F.col("_n_str")
            < F.col("_n_min") * F.lit(_SPLIT_BUCKETS)
        )
        .select(F.col(id_col), F.col(stratum_col), F.col("_bucket").cast("int").alias("bucket"))
    )


def sample_weighted(
    scored: DataFrame,
    *,
    k: int = 100,
    weight_col: str = "quality",
    id_col: str = "doc_id",
    salt: str = "wsample-v1",
) -> DataFrame:
    """Deterministic weighted sampling without replacement (Efraimidis &
    Spirakis 2006): draw ``k`` rows with probability proportional to
    ``weight_col`` by ranking on key = u^(1/w), u a content-derived
    uniform in (0, 1].

    The classic algorithm draws u from an RNG; here u is the md5-prefix
    hash of (salt, id) — so the "random" draw is a pure per-row
    expression: reruns and any partitioning pick the identical sample,
    and re-sampling with a new salt gives an independent draw.
    Ranking uses ROUND(key, 6) — the repo's standard cross-engine
    determinism rule: pow() is a transcendental with no bit-identity
    guarantee between libm implementations, and with many draws the
    top-k boundary is densely packed with near-ties (a raw
    full-precision rank picked a different 100th row than DuckDB at
    sf1's 50k docs — round-12 sweep). Rounded-key ties resolve by a
    SECOND independent hash draw, not the raw id (r12 ADVICE: at large
    n the 1e-6 quantum collapses many boundary keys, and an id
    tie-break would select the marginal rows by id order — a
    weight-proportionality bias that grows with corpus size; a hash
    draw keeps the marginal pick uniform). The id is the final
    tie-break only for bit-identical double ties.
    Selection is ORDER BY key DESC LIMIT k — Spark executes that as
    per-partition partial top-k (TakeOrderedAndProject) + a k-row driver
    merge, never a global sort, so the cost at 100 TB is one scan.
    Weights must be > 0 (u^(1/w) -> u^inf -> 0 as w -> 0+, so nonpositive
    weights would be undefined; quality scores here are in (0, 1]).
    """
    from .dedup import H32

    u = (
        f"(cast({H32.format(col=f'concat(%r, cast({id_col} as string))' % salt)} "
        "as double) + 1.0) / 4294967296.0"
    )
    tb = H32.format(col=f"concat(%r, cast({id_col} as string))" % (salt + "#tb"))
    return (
        scored.select(
            id_col,
            F.col(weight_col).alias("w"),
            F.round(F.expr(f"power({u}, 1.0 / {weight_col})"), 6).alias("skey"),
            F.expr(tb).alias("_tb"),
        )
        .orderBy(F.desc("skey"), "_tb", id_col)
        .limit(k)
        .drop("_tb")
    )


def chunk_windows(
    docs: DataFrame,
    *,
    window: int = 64,
    overlap: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, chunk_idx, start_word, n_words, chunk): overlapping
    word-window chunks — the retrieval/RAG indexing shape (one row per
    passage, deterministic ids, word offsets back into the source).

    Chunk starts step by ``stride = window - overlap``; every document
    yields at least one chunk, and the final partial chunk keeps the
    tail words (standard passage-window semantics, e.g. DPR's 100-word
    windows). Pure JVM expressions end-to-end: split once, explode a
    ``sequence`` of starts, ``slice`` the word array per start — no
    Python, no shuffle (the explode preserves input partitioning), so at
    100 TB this runs at scan speed and the output is ready for the
    similarity/BM25 operators downstream.
    """
    if not (0 <= overlap < window):
        raise ValueError(f"need 0 <= overlap < window, got {overlap}/{window}")
    stride = window - overlap
    words = F.split(F.col(text_col), " ")
    n = F.size(words)
    # last start: the largest multiple of stride strictly below n (n >= 1
    # word given non-empty text; empty text still yields chunk 0)
    last = F.greatest(
        F.lit(0), (F.ceil((n - F.lit(window)) / F.lit(stride))).cast("long") * stride
    )
    return (
        docs.select(
            F.col(id_col),
            words.alias("_w"),
            F.posexplode(
                F.sequence(
                    F.lit(0).cast("long"), last, F.lit(stride).cast("long")
                )
            ).alias("chunk_idx", "start_word"),
        )
        .select(
            F.col(id_col),
            F.col("chunk_idx"),
            F.col("start_word").cast("int").alias("start_word"),
            F.least(
                F.lit(window), F.size("_w") - F.col("start_word").cast("int")
            ).alias("n_words"),
            F.array_join(
                F.slice("_w", F.col("start_word").cast("int") + 1, window), " "
            ).alias("chunk"),
        )
    )


def mix_weights(
    docs: DataFrame,
    *,
    group_col: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """(group, n_docs, group_tokens, token_share, mix_weight): the
    data-MIXTURE reweighting table a training pipeline derives before
    sampling — per-group token mass vs a uniform target share, weight =
    target_share / actual_share (the factor a sampler multiplies into
    per-doc probabilities to hit the target mix; > 1 upsample,
    < 1 downsample).

    Scale shape: ONE group-keyed aggregate over the corpus (map-side
    combinable token sums), then arithmetic on the group-cardinality
    result joined to its own 1-row total — corpus-size work is a single
    pass, the mixture math never touches the corpus again. Token counts
    are exact integers; shares/weights round to 6 after double division
    (both engines' IEEE division agrees)."""
    lt = docs.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(F.split(text_col, " "))).alias("group_tokens"),
    )
    tot = lt.agg(
        F.sum("group_tokens").alias("_total"), F.count(F.lit(1)).alias("_n_groups")
    )
    share = F.col("group_tokens").cast("double") / F.col("_total").cast("double")
    return (
        lt.crossJoin(F.broadcast(tot))
        .select(
            group_col,
            "n_docs",
            "group_tokens",
            F.round(share, 6).alias("token_share"),
            F.round((F.lit(1.0) / F.col("_n_groups")) / share, 6).alias("mix_weight"),
        )
        .orderBy(group_col)
    )


def export_shards(
    docs: DataFrame,
    out_dir: str,
    *,
    partition_col: str = "lang",
    max_rows_per_file: int = 64,
    order_col: str = "doc_id",
) -> DataFrame:
    """Write the corpus as training shards and return the verified manifest
    (partition value, n_rows, n_files) read back FROM THE WRITTEN FILES.

    Layout: hive-partitioned parquet directories by ``partition_col``,
    file size bounded by ``maxRecordsPerFile``, rows sorted by
    ``order_col`` within each task so shard contents are byte-reproducible
    run to run — the write side of a training pipeline (samplers address
    shards deterministically; a re-export after a small upstream change
    rewrites only the partitions it touched).

    Determinism of the file count: ``repartition(partition_col)`` sends
    each partition value to exactly one task, so a partition directory is
    written by one writer and splits into exactly
    ceil(n_rows / max_rows_per_file) files — the manifest is predictable
    from the row counts alone, which is what the oracle checks. At 100 TB
    scale, swap the single-task-per-value repartition for
    ``repartitionByRange(partition_col, order_col)`` plus a per-file row
    bound to keep writer parallelism within hot partitions.
    """
    (
        docs.repartition(F.col(partition_col))
        .sortWithinPartitions(partition_col, order_col)
        .write.mode("overwrite")
        .option("maxRecordsPerFile", max_rows_per_file)
        .partitionBy(partition_col)
        .parquet(out_dir)
    )
    spark = docs.sparkSession
    back = spark.read.parquet(out_dir).withColumn("_file", F.input_file_name())
    return (
        back.groupBy(partition_col)
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct("_file").alias("n_files"),
        )
        .orderBy(partition_col)
    )
