"""Text analysis operators: token stats, quality scoring, language-ID
heuristic, document fingerprinting.

Everything is integer-derived or exact-decimal arithmetic so results are
engine-reproducible; tokenization is single-space split (matching the
corpus) — swap the splitter expression for a BPE-ish regex on real data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import H32

STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "it", "on", "for"]

FP_B = 1000003
FP_P = 2147483647


def token_stats(docs: DataFrame) -> DataFrame:
    """Per-language corpus statistics from whitespace tokens."""
    t = docs.select("lang", F.split("text", " ").alias("toks"), "n_chars")
    per_doc = t.select(
        "lang",
        F.size("toks").alias("n_tokens"),
        "n_chars",
    )
    return (
        per_doc.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            (F.sum("n_tokens").cast("double") / F.count(F.lit(1))).alias("avg_tokens"),
            F.sum("n_chars").alias("total_chars"),
            F.max("n_tokens").alias("max_tokens"),
        )
        .orderBy("lang")
    )


def quality_score(docs: DataFrame) -> DataFrame:
    """Per-document quality score: length + lexical-diversity mix."""
    t = docs.select("doc_id", "lang", F.split("text", " ").alias("toks"))
    scored = t.select(
        "doc_id",
        "lang",
        F.size("toks").alias("n_tokens"),
        F.size(F.array_distinct("toks")).alias("n_uniq"),
    ).select(
        "doc_id",
        "lang",
        "n_tokens",
        "n_uniq",
        (F.col("n_uniq").cast("double") / F.col("n_tokens")).alias("uniq_ratio"),
        (
            F.least(F.col("n_tokens").cast("double") / 100.0, F.lit(1.0)) * 0.5
            + (F.col("n_uniq").cast("double") / F.col("n_tokens")) * 0.5
        ).alias("quality"),
    )
    return scored.withColumn("is_low_quality", F.col("quality") < 0.5).orderBy("doc_id")


def lang_id(docs: DataFrame) -> DataFrame:
    """Stopword-ratio language heuristic vs. the labeled lang column."""
    stop_arr = "array(" + ",".join(f"'{w}'" for w in STOPWORDS) + ")"
    t = docs.select("doc_id", "lang", F.split("text", " ").alias("toks"))
    scored = t.select(
        "doc_id",
        "lang",
        F.size("toks").alias("n_tokens"),
        F.expr(f"size(filter(toks, x -> array_contains({stop_arr}, x)))").alias("n_stop"),
    ).select(
        "doc_id",
        "lang",
        (F.col("n_stop").cast("double") / F.col("n_tokens")).alias("stop_ratio"),
    )
    return scored.withColumn(
        "pred_lang", F.when(F.col("stop_ratio") >= 0.08, "en").otherwise("other")
    ).orderBy("doc_id")


def tfidf_top_terms(docs: DataFrame, *, k: int = 3) -> DataFrame:
    """Per-document top-k terms by TF-IDF (ln(N/df) idf, raw tf).

    Two shuffles total: one to build the document-frequency table (an
    aggregate over distinct doc-term pairs), one for the per-document
    top-k (partitioned window). The df table is a pure aggregate —
    map-side partial counts keep the shuffle small at corpus scale.
    Ties are broken by term text so output is deterministic.
    """
    toks = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("term")
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    # corpus doc count rides as a 1-row broadcast (scalar join), not a
    # driver collect: the whole pipeline stays lazy and single-job
    n_tbl = docs.agg(F.countDistinct("doc_id").cast("double").alias("_n"))
    df_tbl = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        tf.join(df_tbl, "term")
        .join(F.broadcast(n_tbl))
        .select(
            "doc_id",
            "term",
            F.round(
                F.col("tf") * F.log(F.col("_n") / F.col("df")), 6
            ).alias("tfidf"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("doc_id", "term", "tfidf", "rn")
        .orderBy("doc_id", "rn")
    )


def _bm25_term_scores(
    docs: DataFrame,
    *,
    k1: float = 1.2,
    b: float = 0.75,
    terms: list[str] | None = None,
) -> DataFrame:
    """(doc_id, term, s): raw BM25 score per (doc, term) — the ONE
    implementation of the formula (Lucene +1 idf, k1/b length norm) shared
    by :func:`bm25_top_terms` and :func:`bm25_query_scores`.

    ``terms`` restricts the postings to a query term set BEFORE the
    doc-frequency join (the inverted-index access pattern); the resulting
    df table is tiny and broadcast. Without ``terms`` the df table is
    vocabulary-sized and must shuffle-join. An empty corpus yields an
    empty frame (avgdl defaults harmlessly; no rows flow).
    """
    toks = docs.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    # global (n, avgdl) ride as a 1-row broadcast (scalar join), not a
    # driver collect — same doubles, but the pipeline stays lazy and
    # single-job. COALESCE keeps the empty-corpus contract (no rows flow,
    # so the 1.0 only pacifies the expression).
    stats_tbl = dl.agg(
        F.count(F.lit(1)).cast("double").alias("_n"),
        F.coalesce(F.avg("dl"), F.lit(1.0)).alias("_avgdl"),
    )
    if terms is not None:
        tf = tf.filter(F.col("term").isin(list(terms)))
    df_tbl = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    if terms is not None:
        df_tbl = F.broadcast(df_tbl)
    idf = F.log(
        (F.col("_n") - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
        + F.lit(1.0)
    )
    denom = F.col("tf") + F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("_avgdl")
    )
    return (
        tf.join(df_tbl, "term")
        .join(F.broadcast(dl), "doc_id")
        .join(F.broadcast(stats_tbl))
        .select(
            "doc_id",
            "term",
            (idf * F.col("tf") * F.lit(k1 + 1.0) / denom).alias("s"),
        )
    )


def bm25_top_terms(
    docs: DataFrame, *, k: int = 3, k1: float = 1.2, b: float = 0.75
) -> DataFrame:
    """Per-document top-k terms by BM25 (Robertson/Sparck-Jones idf with the
    Lucene-style +1 inside the log, so scores stay positive).

    Same shuffle shape as :func:`tfidf_top_terms` — a doc-frequency
    aggregate and a per-document top-k window — plus one tiny per-document
    length aggregate that joins back broadcast-style. N and avgdl ride as
    a 1-row broadcast scalar join (the plan stays lazy and single-job).
    """
    scored = _bm25_term_scores(docs, k1=k1, b=b).select(
        "doc_id", "term", F.round(F.col("s"), 6).alias("bm25")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy(F.desc("bm25"), F.asc("term"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("doc_id", "term", "bm25", "rn")
        .orderBy("doc_id", "rn")
    )


def fingerprint(docs: DataFrame) -> DataFrame:
    """Rolling polynomial hash over token hashes: order-sensitive document
    fingerprint (fp = fold (acc*B + h32(tok) mod P))."""
    t = docs.select("doc_id", F.split("text", " ").alias("toks"))
    h = H32.format(col="x")
    return t.select(
        "doc_id",
        F.expr(
            f"aggregate(toks, cast(0 as bigint), (acc, x) -> (acc * {FP_B} + ({h} % {FP_P})) % {FP_P})"
        ).alias("fp"),
    ).orderBy("doc_id")


def winnow_fingerprints(
    docs: DataFrame, *, k: int = 3, w: int = 4,
    id_col: str = "doc_id", text_col: str = "text",
) -> DataFrame:
    """(doc_id, fp): the document's winnowing fingerprint SET — per-window
    (w) minimum of the token k-gram hashes, distinct per doc. The ONE
    implementation of the selection expression, shared by
    :func:`winnowing_shared` (corpus screen) and
    ``dedup.winnow_containment`` (candidate generator): selection is a
    pure per-row expression (no shuffle), and the exploded output carries
    ~2/(w+1) the rows of the full shingle table."""
    m = f"(size(toks) - {k - 1})"  # k-gram count
    h = H32.format(col="g")
    grams = f"transform(sequence(1, {m}), i -> array_join(slice(toks, i, {k}), ' '))"
    hashes = f"transform({grams}, g -> {h})"
    # let-bind the hash array (lambda vars are single nodes): inlining it
    # into the per-window lambda would recompute EVERY gram's md5 once per
    # window — O(m^2) digests per document (measured 20.6s -> sub-second
    # at sf0.1); the round-7 expression-tree rule again
    fps = (
        f"element_at(transform(array({hashes}), hs -> "
        f"array_distinct(CASE WHEN size(hs) < {w} THEN array(array_min(hs)) "
        f"ELSE transform(sequence(1, size(hs) - {w - 1}), "
        f"i -> array_min(slice(hs, i, {w}))) END)), 1)"
    )
    return (
        docs.select(id_col, F.split(text_col, " ").alias("toks"))
        .filter(F.size("toks") >= k)
        .select(id_col, F.explode(F.expr(fps)).alias("fp"))
    )


def winnowing_shared(
    docs: DataFrame, *, k: int = 3, w: int = 4,
    id_col: str = "doc_id", text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_fps, n_shared, shared_frac): winnowing fingerprints
    (Schleimer/Wilkerson/Aiken 2003 — the MOSS algorithm): token k-gram
    hashes, one MINIMUM selected per w-hash window, the distinct minima
    forming the document's fingerprint set. The winnowing guarantee: any
    shared run of at least w+k-1 tokens yields at least one shared
    fingerprint, at an expected density of 2/(w+1) — position-robust
    overlap detection at a fraction of full-shingle cost (the standard
    plagiarism/near-dup screen between exact hashing and MinHash).

    Output is the corpus screen: per document, the share of its
    fingerprints occurring in at least one other document.

    Scale shape: fingerprint selection is a pure per-row expression
    (windows over an in-row array — no shuffle, whole-row HOFs); then ONE
    fingerprint-keyed df aggregate and a join back, exactly the
    ngram_duplication shape but over the ~2/(w+1)-thinned fingerprint set
    instead of every shingle — at 100 TB the shuffle carries w/2 x fewer
    8-byte keys. Docs shorter than k tokens have no fingerprints and drop
    (both engines agree); a doc with fewer than w hashes contributes the
    single minimum of what it has (one-window semantics).

    The set-valued tie question (leftmost vs rightmost minimum per
    window) is moot here: equal minima select equal VALUES, and the
    fingerprint SET deduplicates them, so both engines agree without a
    positional tie rule."""
    from pyspark.sql import Window

    fp = winnow_fingerprints(docs, k=k, w=w, id_col=id_col, text_col=text_col)
    # fingerprint df via a PARTITIONED count window, not groupBy+join-back:
    # the join formulation re-runs the tokenize+gram+md5 explode lineage
    # (the dominant stage) a second time for the probe side — same call as
    # cross_doc_ngram_fraction; fp partitions are tiny (docs sharing one
    # fingerprint), never a single-task funnel
    return (
        fp.withColumn("df", F.count(F.lit(1)).over(Window.partitionBy("fp")))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_fps"),
            F.sum(F.when(F.col("df") > 1, 1).otherwise(0)).alias("n_shared"),
        )
        .withColumn("shared_frac", F.round(F.col("n_shared") / F.col("n_fps"), 6))
        .orderBy(id_col)
    )


#: BPE-style pretokenizer classes (GPT-2-family pretokenizers split words,
#: numbers, and punctuation runs before byte-pair merging); the class regex
#: is chosen to behave identically under Java regex and RE2-style engines
BPE_TOKEN_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"


def bpe_pretokenize_stats(docs: DataFrame) -> DataFrame:
    """Per-document BPE-pretokenizer token counts (words / numbers / punct).

    The training-data question this answers: how many BPE-ish tokens does a
    document cost, before running a real tokenizer? One scan, one regex
    extraction in codegen; no UDFs, no shuffle beyond the final sort.
    """
    toks = docs.select(
        "doc_id",
        F.expr(f"regexp_extract_all(text, '{BPE_TOKEN_RE}', 0)").alias("toks"),
    )
    is_word = "x rlike '^[A-Za-z]'"
    is_num = "x rlike '^[0-9]'"
    return toks.select(
        "doc_id",
        F.size("toks").alias("n_tokens"),
        F.expr(f"size(filter(toks, x -> {is_word}))").alias("n_word"),
        F.expr(f"size(filter(toks, x -> {is_num}))").alias("n_num"),
        (
            F.size("toks")
            - F.expr(f"size(filter(toks, x -> {is_word}))")
            - F.expr(f"size(filter(toks, x -> {is_num}))")
        ).alias("n_punct"),
    ).orderBy("doc_id")


def repetition_stats(docs: DataFrame, *, n: int = 3) -> DataFrame:
    """Per-document repetition signals — the Gopher-style quality filter
    for machine-generated / boilerplate text: the fraction of duplicate
    words and duplicate word ``n``-grams within each document.

    Everything is a pure per-row array expression (split → n-gram window →
    ``array_distinct``): zero shuffles, zero UDFs, embarrassingly parallel
    at any corpus size. Ratios are ``1 - distinct/total`` on exact integer
    counts, so any engine reproduces the doubles bit-for-bit.
    """
    sep = "\\u001f"  # unit separator: cannot appear in space-split tokens
    grams = (
        f"CASE WHEN size(toks) < {n} THEN array() "
        f"ELSE transform(sequence(1, size(toks) - {n} + 1), "
        f"i -> array_join(slice(toks, i, {n}), '{sep}')) END"
    )
    t = docs.select("doc_id", F.split("text", " ").alias("toks")).select(
        "doc_id",
        F.size("toks").alias("n_tokens"),
        F.size(F.array_distinct("toks")).alias("_dw"),
        F.expr(f"size({grams})").alias("n_ngrams"),
        F.expr(f"size(array_distinct({grams}))").alias("_dg"),
    )
    return t.select(
        "doc_id",
        "n_tokens",
        F.when(F.col("n_tokens") == 0, F.lit(0.0))
        .otherwise(1.0 - F.col("_dw") / F.col("n_tokens"))
        .alias("dup_word_ratio"),
        "n_ngrams",
        F.when(F.col("n_ngrams") == 0, F.lit(0.0))
        .otherwise(1.0 - F.col("_dg") / F.col("n_ngrams"))
        .alias("dup_ngram_ratio"),
    ).orderBy("doc_id")


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    *,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Benchmark decontamination: for every document, the fraction of its
    word ``n``-grams that appear in a benchmark/eval set — the standard
    filter for keeping test sets out of training data (production uses
    n≈8–13).

    Scale shape: the benchmark gram set is SMALL (eval suites are KBs–MBs)
    — distinct grams broadcast to every executor; the corpus side explodes
    its grams, left-joins the broadcast, and re-aggregates per document.
    The only fact-side shuffle is the per-document groupBy; the benchmark
    never shuffles the corpus.
    """
    sep = "\\u001f"
    grams = (
        f"CASE WHEN size(toks) < {n} THEN array() "
        f"ELSE transform(sequence(1, size(toks) - {n} + 1), "
        f"i -> array_join(slice(toks, i, {n}), '{sep}')) END"
    )
    def _grams(df):
        return df.select(
            F.col(id_col), F.split(text_col, " ").alias("toks")
        ).select(F.col(id_col), F.explode_outer(F.expr(grams)).alias("gram"))

    bench_grams = _grams(benchmark).select("gram").distinct()
    hit = (
        _grams(docs)
        .join(
            F.broadcast(bench_grams.withColumn("_hit", F.lit(1))),
            "gram",
            "left",
        )
        .groupBy(id_col)
        .agg(
            F.count("gram").alias("n_grams"),
            F.count("_hit").alias("n_hit"),
        )
    )
    return hit.select(
        id_col,
        F.col("n_grams").cast("int").alias("n_grams"),
        F.col("n_hit").cast("int").alias("n_hit"),
        F.when(F.col("n_grams") == 0, F.lit(0.0))
        .otherwise(F.col("n_hit") / F.col("n_grams"))
        .alias("contam_ratio"),
    ).orderBy(id_col)


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    *,
    left_id: str = "doc_id",
    right_id: str = "probe_id",
    left_col: str = "title",
    right_col: str = "probe",
    max_dist: int = 8,
) -> DataFrame:
    """Approximate string join: best left match per right row by edit
    distance, with shared-word-token blocking.

    The naive form is a cross join with levenshtein() in the predicate —
    a nested loop that dies at scale. Here both sides explode to distinct
    word tokens and candidates come from ONE equi-join on the token (two
    strings within small edit distance of each other share at least one
    unedited word); the exact distance then runs only on candidates, and
    the per-probe argmin is a bounded window. The token join is the only
    data-sized shuffle; a hot-token df cap can bound fan-out the same way
    ngram_jaccard_pairs caps shingles.

    Ties on distance break to the lowest left id. Rows with no candidate
    within ``max_dist`` are dropped (inner semantics).
    """
    from pyspark.sql import Window

    lw = left.select(
        left_id,
        left_col,
        F.explode(F.array_distinct(F.split(F.col(left_col), " "))).alias("_w"),
    )
    rw = right.select(
        right_id,
        right_col,
        F.explode(F.array_distinct(F.split(F.col(right_col), " "))).alias("_w"),
    )
    cand = lw.join(rw, "_w").select(left_id, left_col, right_id, right_col).distinct()
    scored = cand.select(
        right_id,
        left_id,
        F.levenshtein(F.col(left_col), F.col(right_col)).cast("int").alias("dist"),
    ).filter(F.col("dist") <= max_dist)
    w = Window.partitionBy(right_id).orderBy("dist", left_id)
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


def bm25_query_scores(
    docs: DataFrame,
    terms: list[str],
    *,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """(doc_id, score): BM25 relevance of every matching document for a
    bag-of-terms query — the lexical half of a hybrid retrieval stack.

    Identical formula and shuffle shape to :func:`bm25_top_terms`, but the
    term table is filtered to the (tiny, broadcast-literal) query term set
    BEFORE the doc-frequency join, so only query-term postings ever
    shuffle — the inverted-index access pattern, expressed relationally.
    Documents containing none of the terms drop out (score undefined, not
    zero), matching what a posting-list union returns.
    """
    return (
        _bm25_term_scores(docs, k1=k1, b=b, terms=terms)
        .groupBy("doc_id")
        .agg(F.round(F.sum(F.col("s").cast("decimal(27,15)")).cast("double"), 6).alias("score"))
    )


def unigram_logppl(docs: DataFrame) -> DataFrame:
    """(doc_id, avg_nll, n_tokens): average unigram negative log-likelihood
    per document under the corpus's own unigram distribution — the
    perplexity-proxy quality signal (CCNet-style: documents whose tokens
    are improbable under the corpus LM are outliers worth inspecting or
    dropping; here the LM is the corpus itself, no external model).

    Scale shape: one vocabulary-keyed aggregate (map-side combinable) for
    the frequencies, one join of the token stream back against it (at
    real-corpus vocabulary sizes this is a shuffle join on the term; a
    capped/truncated vocabulary would broadcast), one per-document
    aggregate. Per-token nll sums in DECIMAL(27,15) so the per-doc means
    are partitioning- and engine-independent.
    """
    toks = docs.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    # lazy 1-row total cross-joined in (the oracle's tot CTE shape): no
    # eager corpus scan at plan-construction time, one plan end-to-end
    total = toks.agg(F.count(F.lit(1)).cast("double").alias("_tot"))
    freq = toks.groupBy("term").agg(F.count(F.lit(1)).alias("c"))
    nll = -F.log(F.col("c").cast("double") / F.col("_tot"))
    return (
        toks.join(freq, "term")
        .crossJoin(F.broadcast(total))
        .select("doc_id", nll.alias("nll"))
        .groupBy("doc_id")
        .agg(
            F.round(
                F.sum(F.col("nll").cast("decimal(27,15)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("avg_nll"),
            F.count(F.lit(1)).alias("n_tokens"),
        )
        .orderBy("doc_id")
    )


#: default PII pattern registry: (name, regex, replacement) triples,
#: written in the RE2-compatible subset that Java and DuckDB regex
#: engines evaluate identically (no lookaround, no \s shorthand inside
#: classes, explicit quantifier bounds). Users extend/replace this list
#: — e.g. SSN ('[0-9]{3}-[0-9]{2}-[0-9]{4}'), credit cards, API keys —
#: and pass it to pii_scan/pii_redact; replacements apply IN ORDER, so
#: earlier patterns win on overlapping spans.
DEFAULT_PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[PII]"),
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "[PII]"),
    ("phone", r"\+[0-9]{7,15}", "[PII]"),
]

#: legacy name->regex view of the defaults (kept for callers of the
#: pre-registry API)
PII_PATTERNS = {name: rx for name, rx, _ in DEFAULT_PII_PATTERNS}


def pii_redact(
    docs: DataFrame,
    *,
    text_col: str = "text",
    patterns: list[tuple[str, str, str]] | None = None,
    out_col: str = "redacted",
) -> DataFrame:
    """Append ``out_col``: the text with every pattern span replaced by
    its registry replacement, applied in registry order (pure JVM
    regexp_replace chain — zero shuffle, rides the corpus partitioning).
    """
    red = F.col(text_col)
    for _name, rx, repl in (DEFAULT_PII_PATTERNS if patterns is None else patterns):
        red = F.regexp_replace(red, rx, repl)
    return docs.withColumn(out_col, red)


def pii_scan(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    patterns: list[tuple[str, str, str]] | None = None,
) -> DataFrame:
    """(id, n_<name> per registry pattern, n_pii, redacted_len): PII span
    detection + redaction accounting — the C4/Dolma/FineWeb-style scrub
    stage every training pipeline runs before release.

    ``patterns``: the ``(name, regex, replacement)`` registry (defaults
    to :data:`DEFAULT_PII_PATTERNS`); one ``n_<name>`` count column per
    entry, ``n_pii`` their sum, ``redacted_len`` the length after the
    in-order replacement chain.

    Scale shape: pure per-row JVM regex expressions (regexp_extract_all /
    regexp_replace inside whole-stage codegen) — zero shuffle, zero
    Python; the scan rides whatever partitioning the corpus already has.
    ``redacted_len`` lets downstream token accounting subtract scrubbed
    mass without materializing the redacted corpus.
    """
    pats = DEFAULT_PII_PATTERNS if patterns is None else list(patterns)
    if not pats:
        raise ValueError("pii_scan needs at least one (name, regex, replacement)")
    t = F.col(text_col)
    # Column-typed patterns, NOT F.expr: a SQL string literal would eat
    # the regex backslashes under the default parser escaping
    counts = [
        F.size(F.regexp_extract_all(t, F.lit(rx), F.lit(0)))
        .cast("bigint")
        .alias(f"n_{name}")
        for name, rx, _ in pats
    ]
    total = counts[0]
    for c in counts[1:]:
        total = total + c
    red = t
    for _name, rx, repl in pats:
        red = F.regexp_replace(red, rx, repl)
    return docs.select(
        id_col,
        *counts,
        total.alias("n_pii"),
        F.length(red).cast("bigint").alias("redacted_len"),
    ).orderBy(id_col)
