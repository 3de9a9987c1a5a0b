"""Text-analysis operators (north-star LLM-pipeline ops over ``documents``).

All pure JVM-side expressions (split/filter/aggregate higher-order
functions) — no Python UDFs — and all cross-engine deterministic so the
DuckDB oracle can verify them:

- :func:`token_count`   — whitespace tokenization count
- :func:`lang_id`       — stopword-hit n-gram heuristic language guess
- :func:`quality_score` — length / punctuation / stopword-ratio blend
- :func:`fingerprint`   — rolling polynomial hash of the full text
- :func:`text_stats`    — per-language corpus statistics
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from agile_lakehouse_spark.functions import portable
from agile_lakehouse_spark.functions.portable import round4

# Tiny distinctive-stopword lists; the heuristic is intentionally simple and
# fully SQL-expressible (same CASE logic in the DuckDB oracle).
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of"),
    "de": ("der", "und", "nicht"),
    "fr": ("le", "et", "les"),
    "es": ("el", "y", "los"),
    "zh": ("de5", "shi4", "le5"),
}

STOPWORDS = ("the", "a", "and", "of", "to", "in", "is", "it")


def _tokens(text_col: str) -> Column:
    return F.expr(portable.tokens_spark(text_col))


def token_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append ``n_tokens`` = whitespace token count (BPE-ish proxy)."""
    return df.withColumn("n_tokens", F.size(_tokens(text_col)).cast("bigint"))


def _marker_hits(text_col: str, words: tuple[str, ...]) -> Column:
    toks = _tokens(text_col)
    arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append ``lang_pred``: language with the most marker-token hits.

    Ties broken by fixed language order (en, de, fr, es, zh) — strictly
    deterministic, mirrored in the oracle SQL.
    """
    out = df
    for lang, words in LANG_MARKERS.items():
        out = out.withColumn(f"_hits_{lang}", _marker_hits(text_col, words))
    langs = list(LANG_MARKERS)
    best = F.greatest(*[F.col(f"_hits_{lang}") for lang in langs])
    pred = F.lit("unknown")
    for lang in reversed(langs):
        pred = F.when((best > 0) & (F.col(f"_hits_{lang}") == best), F.lit(lang)).otherwise(pred)
    out = out.withColumn("lang_pred", pred)
    return out.drop(*[f"_hits_{lang}" for lang in langs])


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append ``quality`` in [0,1]: 0.4·length + 0.3·(1-punct) + 0.3·stopword.

    - length score: min(chars/500, 1) — favors substantive docs
    - punctuation ratio: fraction of [.,;:!?] characters (lower is better)
    - stopword ratio: fraction of tokens in a tiny function-word set
      (natural text has some; keyboard mash has none)
    """
    n = F.length(F.col(text_col)).cast("double")
    len_score = F.least(n / 500.0, F.lit(1.0))
    n_punct = n - F.length(F.regexp_replace(F.col(text_col), "[.,;:!?]", "")).cast("double")
    punct_ratio = F.when(n > 0, n_punct / n).otherwise(F.lit(0.0))
    toks = _tokens(text_col)
    stop_arr = F.array(*[F.lit(w) for w in STOPWORDS])
    n_tok = F.size(toks).cast("double")
    stop_ratio = F.when(
        n_tok > 0, F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t))).cast("double") / n_tok
    ).otherwise(F.lit(0.0))
    q = 0.4 * len_score + 0.3 * (1.0 - punct_ratio) + 0.3 * F.least(stop_ratio * 5.0, F.lit(1.0))
    return df.withColumn("quality", round4(q))


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append ``fp``: rolling polynomial hash of the text (mod 1e9+7)."""
    return df.withColumn("fp", F.expr(portable.fingerprint_spark(text_col)).cast("bigint"))


def top_terms(df: DataFrame, n: int = 5, text_col: str = "text", lang_col: str = "lang") -> DataFrame:
    """Top-n most frequent tokens per language (tf table + ranking window).

    Explode -> count per (lang, token) -> row_number per lang.  The tf
    aggregation map-side combines before the shuffle; the window runs on
    the already-tiny aggregate.
    """
    from pyspark.sql.window import Window

    from agile_lakehouse_spark.operators.dedup import spread

    toks = spread(df).select(F.col(lang_col), F.explode(_tokens(text_col)).alias("tok"))
    tf = toks.groupBy(lang_col, "tok").agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
    w = Window.partitionBy(lang_col).orderBy(F.desc("tf"), F.asc("tok"))
    return (
        tf.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= n)
        .orderBy(lang_col, "rnk")
    )


def text_stats(df: DataFrame, text_col: str = "text", lang_col: str = "lang") -> DataFrame:
    """Per-language corpus stats: docs, avg chars, avg tokens, distinct texts."""
    with_tok = token_count(df, text_col)
    return (
        with_tok.groupBy(lang_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            round4(F.avg(F.length(text_col))).alias("avg_chars"),
            round4(F.avg("n_tokens")).alias("avg_tokens"),
            F.countDistinct(text_col).cast("bigint").alias("n_distinct"),
        )
        .orderBy(lang_col)
    )


# GPT-2-style pre-tokenizer approximation, ASCII-explicit so the Java
# (Spark) and RE2 (DuckDB) regex engines agree: contraction suffixes,
# space-prefixed letter runs, digit runs, punctuation runs.
BPE_REGEX = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s']+"


def bpe_token_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append ``n_bpe_tokens``: count of BPE-ish pre-tokens.

    A closer proxy for LLM token budgets than whitespace counts (captures
    punctuation splits and contractions); still pure JVM regex — no
    tokenizer library in the hot path.
    """
    return df.withColumn(
        "n_bpe_tokens",
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(BPE_REGEX), F.lit(0))).cast("bigint"),
    )


def tfidf_top_terms(df: DataFrame, n: int = 3, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Top-n TF-IDF terms per document (DQ37).

    tf = term count in doc; idf = N/df as a RATIONAL (no log): ``ln`` is
    libm-dependent and can differ in the last ulp across engines, while
    division of identical doubles is IEEE-exact — the ranking is the same
    monotone order either way.  Three hash aggregations (doc-term tf,
    term df, global N) + one broadcast-joined scoring pass; the window
    ranks within each doc only.
    """
    from pyspark.sql.window import Window as W

    from agile_lakehouse_spark.operators.dedup import spread

    toks = spread(df).select(
        F.col(id_col), F.explode(_tokens(text_col)).alias("tok")
    )
    tf = toks.groupBy(id_col, "tok").agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
    dfreq = tf.groupBy("tok").agg(F.count(F.lit(1)).cast("bigint").alias("df"))
    n_docs = df.agg(F.count(F.lit(1)).cast("double").alias("n_docs"))
    scored = (
        tf.join(F.broadcast(dfreq), "tok")
        .crossJoin(F.broadcast(n_docs))
        .withColumn("score", round4(F.col("tf") * (F.col("n_docs") / F.col("df"))))
    )
    w = W.partitionBy(id_col).orderBy(F.desc("score"), F.asc("tok"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= n)
        .select(id_col, "tok", "tf", "score", "rnk")
    )


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int = 50,
    stride: int = 40,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split documents into overlapping token windows (DQ46) — the
    context-window chunking step of a training/RAG ingest pipeline.

    Chunk i covers tokens [i*stride, i*stride + chunk_tokens); the number
    of chunks is 1 + ceil(max(n - chunk_tokens, 0) / stride), so EVERY
    token lands in ≥1 chunk (ceil, not floor — floor silently drops the
    tail whenever (n - chunk_tokens) % stride != 0) and the last window
    may be short.  Pure JVM higher-order functions: ``sequence`` generates
    chunk ids per doc (distributed — rows expand in place, no driver
    loop), ``slice`` takes each window.  Rows amplify by ~n/stride: at
    100 TB feed this through ``dedup.spread`` first for partition-count
    headroom.
    """
    toks = _tokens(text_col)
    n_chunks = (
        F.lit(1)
        + F.ceil(
            F.greatest(F.size(toks) - chunk_tokens, F.lit(0)) / F.lit(stride)
        ).cast("int")
    )
    chunked = df.select(
        F.col(id_col),
        toks.alias("_toks"),
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_id"),
    )
    window = F.slice(F.col("_toks"), F.col("chunk_id") * stride + 1, chunk_tokens)
    return chunked.select(
        F.col(id_col),
        F.col("chunk_id").cast("bigint").alias("chunk_id"),
        F.size(window).cast("bigint").alias("n_tokens"),
        F.array_join(window, " ").alias("chunk_text"),
    )


def pack_sequences(
    df: DataFrame,
    capacity: int = 256,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int | str = "auto",
    auto_threshold: int = 20_000_000,
    approx_rows: int | None = None,
    caches: list | None = None,
) -> DataFrame:
    """Greedy contiguous sequence packing (DQ47): assign docs, in id order,
    to fixed-capacity token bins — the batch-packing step before LLM
    training (maximize tokens per batch without shuffling doc order).

    bin = floor((cumsum_tokens - n_tokens) / capacity): a doc starts in
    the bin where its first token falls; a doc straddling a boundary
    overflows its bin (contiguous packing semantics — bins stay in doc
    order, no bin-packing search).

    Semantics == ONE GLOBAL cumsum window over id order, but that window
    funnels the whole corpus through a single task; the default is the
    scale-safe two-phase decomposition (the :func:`fill_token_budget`
    discipline, adapted from hash order to id order):

    1. id-range buckets: ``approxQuantile`` boundaries over the id column
       alone (column-pruned scan, no tokenize) make bucketing MONOTONE in
       id — each bucket is a contiguous run of the global order, balanced
       to ~1/n_buckets of the rows regardless of id distribution.  Any
       monotone bucketing is EXACT here (quantile error only skews bucket
       sizes, never order), which is why an approximate sketch is safe.
    2. per-bucket token sums — n_buckets rows — prefix-sum on the driver
       into per-bucket OFFSETS; the cumsum window then runs PER BUCKET
       (partitionBy bucket) and adds the offset.  Exact integer
       arithmetic, bit-identical to the global window at any input
       partitioning (equivalence-tested).

    ``n_buckets=1`` selects the single global window — the declared,
    oracle-checkable twin, and the fallback for non-numeric id columns
    (quantile sketches need a numeric key; raise ``n_buckets`` as the
    corpus grows, the windowed fraction shrinks as 1/n_buckets).  The
    narrow (id, n_tokens, bucket) table is persisted across the
    bucket-sum action and the final plan — pass ``caches`` to unpersist
    after materializing (the lm_fluency lifetime discipline).

    ``n_buckets="auto"`` (round 9, the default): pick the global window
    below ``auto_threshold`` rows and 64 buckets above — the SCALE.md
    ladder measured the crossover at ~20-50 M docs on local[32]
    (two-phase fixed costs: sketch pass + bucket-sum action + persist;
    7.6 s vs 1.1 s at 0.5 M docs), so small corpora stop paying ~7x for
    scale insurance.  The row estimate (round 10 — an eager ``count()``
    here double-evaluated expensive upstreams) NEVER runs a job: callers
    that know their corpus pass ``approx_rows``; otherwise the Catalyst
    optimized-plan row-count statistic is used when defined, else
    ``sizeInBytes`` over a deliberately LOW 64 bytes/row floor.  File
    sources always report a real size; RDD-backed frames
    (``createDataFrame`` locals) report UNKNOWN (Long.MaxValue), which
    lands on two-phase.  Both the floor and the unknown case err toward
    the two-phase path (a few seconds of fixed cost on a mid-size
    corpus) and never toward funneling a huge corpus through one window
    task — and both paths are bit-identical (equivalence-tested), so a
    misestimate can only move seconds, never a result.  (The two-phase
    path itself still runs its quantile-sketch + bucket-sum actions at
    CALL time — unchanged since round 9 — so callers with expensive
    upstreams who want full laziness pass a small ``approx_rows`` or
    ``n_buckets=1``.)  Non-numeric ids under "auto" take the global path
    instead of raising (the explicit-request contract is unchanged).
    """
    from pyspark.sql.types import NumericType
    from pyspark.sql.window import Window as W

    if n_buckets == "auto":
        numeric = isinstance(df.schema[id_col].dataType, NumericType)
        if not numeric:
            n_buckets = 1
        else:
            est = approx_rows
            if est is None:
                # _jdf/queryExecution is private PySpark API — stable in
                # practice but unversioned, so a Spark major could remove
                # it.  Fall back to the SAFE direction (two-phase, the
                # scale-insurance path) rather than erroring "auto" out.
                try:
                    stats = df._jdf.queryExecution().optimizedPlan().stats()
                    rc = stats.rowCount()
                    if rc.isDefined():
                        est = int(str(rc.get()))
                    else:
                        est = int(str(stats.sizeInBytes())) // 64
                except Exception:
                    est = auto_threshold  # unknown -> assume big -> two-phase
            n_buckets = 64 if est >= auto_threshold else 1
    elif isinstance(n_buckets, str):
        raise ValueError(f"n_buckets must be an int or 'auto', got {n_buckets!r}")

    toks = _tokens(text_col)
    sized = df.select(F.col(id_col), F.size(toks).cast("bigint").alias("n_tokens"))
    if n_buckets <= 1:
        w = W.orderBy(id_col).rowsBetween(W.unboundedPreceding, W.currentRow)
        return (
            sized.withColumn("cum", F.sum("n_tokens").over(w))
            .select(
                id_col,
                "n_tokens",
                F.floor((F.col("cum") - F.col("n_tokens")) / capacity).cast("bigint").alias("bin"),
            )
        )
    if not isinstance(df.schema[id_col].dataType, NumericType):
        raise TypeError(
            f"pack_sequences two-phase path needs a numeric {id_col!r} for "
            "quantile bucketing; pass n_buckets=1 for the global-window form"
        )
    # contiguous-in-order buckets from an approximate quantile sketch of
    # the id column ONLY (tokenization is not evaluated for this action)
    bnds = sorted(
        set(
            df.select(F.col(id_col).cast("double").alias("_id")).approxQuantile(
                "_id", [i / n_buckets for i in range(1, n_buckets)], 0.01
            )
        )
    )
    bucket = F.lit(0)
    for b in bnds:
        bucket = bucket + F.when(F.col(id_col).cast("double") > F.lit(b), 1).otherwise(0)
    sized = sized.withColumn("_bucket", bucket.cast("int")).persist()
    if caches is None:
        import warnings

        warnings.warn(
            "pack_sequences(n_buckets>1, caches=None) persists the sized "
            "(id, n_tokens, bucket) table across the bucket-sum action and "
            "the lazy return, which it cannot unpersist for you; pass a "
            "caches= list and unpersist after materializing (the "
            "lm_fluency lifetime discipline)",
            ResourceWarning,
            stacklevel=2,
        )
    else:
        caches.append(sized)
    sums = dict(
        sized.groupBy("_bucket").agg(F.sum("n_tokens").alias("s")).collect()
    )
    offsets, acc = {}, 0
    for b in range(len(bnds) + 1):
        offsets[b] = acc
        acc += sums.get(b, 0) or 0
    from itertools import chain

    off_map = F.create_map(
        *chain.from_iterable((F.lit(b), F.lit(o)) for b, o in offsets.items())
    )
    w = (
        W.partitionBy("_bucket")
        .orderBy(id_col)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    cum = F.sum("n_tokens").over(w) + F.element_at(off_map, F.col("_bucket"))
    return sized.select(
        id_col,
        "n_tokens",
        F.floor((cum - F.col("n_tokens")) / capacity).cast("bigint").alias("bin"),
    )


def _bigrams(toks) -> Column:
    """Adjacent-token bigram array (empty when fewer than 2 tokens).

    Guarded with CASE: Spark's ``sequence(1, 0)`` yields a DESCENDING
    [1, 0] rather than an empty list, so short docs must short-circuit.
    """
    return F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.concat(F.element_at(toks, i), F.lit(" "), F.element_at(toks, i + 1)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def repetition_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Gopher-style repetition signals per document (DQ87): token count,
    distinct-token count, the most-repeated bigram's count, and the
    top-bigram fraction of all bigram slots.

    Repetition filters are a core LLM training-data gate (Rae et al.,
    "Scaling Language Models: ... Gopher", 2021 §A1.1 use duplicate
    line/n-gram fractions); this is the n-gram variant over the fixture's
    whitespace tokens.  The max-count runs as explode → two map-side
    combinable aggregations; the single ratio is one IEEE division of
    exact integers, then round4.
    """
    from agile_lakehouse_spark.operators.dedup import spread

    toks = _tokens(text_col)
    base = spread(df).select(
        F.col(id_col),
        F.size(toks).cast("bigint").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("bigint").alias("n_distinct_tokens"),
        _bigrams(toks).alias("bgs"),
    )
    mx = (
        base.select(id_col, F.explode("bgs").alias("bg"))
        .groupBy(id_col, "bg")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .groupBy(id_col)
        .agg(F.max("c").alias("max_bigram_count"))
    )
    return (
        base.drop("bgs")
        .join(mx, id_col, "left_outer")
        .select(
            id_col,
            "n_tokens",
            "n_distinct_tokens",
            F.coalesce(F.col("max_bigram_count"), F.lit(0)).cast("bigint").alias("max_bigram_count"),
            round4(
                F.coalesce(F.col("max_bigram_count"), F.lit(0))
                / F.greatest(F.col("n_tokens") - 1, F.lit(1)).cast("double")
            ).alias("top_bigram_frac"),
        )
        .orderBy(id_col)
    )


def rare_bigram_ratio(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Corpus-rare-bigram fraction per document (DQ88): of a doc's
    DISTINCT bigrams, the share that appear in no other document —
    a cheap language-model-flavored novelty/quality signal (rare-n-gram
    mass ≈ unmodelable content; high values flag gibberish, low values
    boilerplate).

    Distinct (doc, bigram) pairs, then the bigram document-frequency as
    an UNORDERED COUNT WINDOW over the same rows — not a self-join against
    a separate aggregate, which would compute the explode+distinct subtree
    twice (measured 2x on the fixture).  One shuffle on the bigram, one on
    the doc; all counts exact; one division, round4.
    """
    from pyspark.sql.window import Window as W

    from agile_lakehouse_spark.operators.dedup import spread

    toks = _tokens(text_col)
    pairs = (
        spread(df)
        .select(F.col(id_col), F.explode(_bigrams(toks)).alias("bg"))
        .distinct()
    )
    dfw = W.partitionBy("bg")
    return (
        pairs.withColumn("df", F.count(F.lit(1)).over(dfw))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_distinct_bigrams"),
            F.sum(F.when(F.col("df") == 1, 1).otherwise(0)).cast("bigint").alias("n_unique_bigrams"),
        )
        .select(
            id_col,
            "n_distinct_bigrams",
            "n_unique_bigrams",
            round4(F.col("n_unique_bigrams") / F.col("n_distinct_bigrams").cast("double")).alias(
                "unique_frac"
            ),
        )
        .orderBy(id_col)
    )


def regex_pattern_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document regex hit counts (DQ89) — the PII-scan / content-tag
    shape of corpus curation, over patterns the fixture text can actually
    hit.  ``regexp_count`` is JVM-side (codegen, no UDF); patterns stick
    to ASCII classes + word boundaries, where Java regex and DuckDB's RE2
    agree exactly.
    """
    return df.select(
        F.col(id_col),
        F.expr(f"regexp_count({text_col}, '\\\\bs\\\\w*')").cast("bigint").alias("n_s_words"),
        F.expr(f"regexp_count({text_col}, '\\\\w*e\\\\b')").cast("bigint").alias("n_e_words"),
        F.expr(f"regexp_count({text_col}, '\\\\btable\\\\b')").cast("bigint").alias("n_table"),
    ).orderBy(id_col)


def normalize_text(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Canonicalization before exact dedup (DQ107): lowercase, strip
    non-alphanumerics to spaces, collapse whitespace runs, trim — then a
    portable fingerprint of the normalized form.

    Exact dedup on RAW text misses trivial variants (case, punctuation,
    spacing); normalize-then-hash is the standard first pass of a corpus
    pipeline (before MinHash handles real paraphrases).  All JVM regex —
    ASCII classes only, where Java and RE2 agree.
    """
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col(text_col)), "[^a-z0-9]+", " "),
            " +",
            " ",
        )
    )
    return df.select(
        F.col(id_col),
        F.length(norm).cast("bigint").alias("n_norm_chars"),
        F.expr(
            portable.hex15_spark(
                f"trim(regexp_replace(regexp_replace(lower({text_col}), '[^a-z0-9]+', ' '), ' +', ' '))"
            )
        ).cast("bigint").alias("norm_fp"),
    )


def upsample_short_docs(
    df: DataFrame,
    target_tokens: int = 200,
    max_copies: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Weighted upsampling by replication (DQ108): short documents emit
    ``min(max_copies, ceil(target/n_tokens))`` copies — the
    data-balancing row amplification step of training-set assembly
    (long docs already dominate the token budget; replication rebalances
    EXAMPLE counts without touching content).

    ``explode(sequence(...))`` amplifies rows in place, distributed — no
    driver loop, no shuffle; copy_idx makes each replica addressable for
    downstream shuffling/sharding.
    """
    toks = _tokens(text_col)
    n = F.size(toks).cast("bigint")
    copies = F.least(
        F.lit(max_copies).cast("bigint"),
        F.ceil(F.lit(target_tokens) / F.greatest(n, F.lit(1))).cast("bigint"),
    )
    return (
        df.select(F.col(id_col), n.alias("n_tokens"), copies.alias("n_copies"))
        .select(
            id_col,
            "n_tokens",
            "n_copies",
            F.explode(F.sequence(F.lit(1).cast("bigint"), F.col("n_copies"))).alias("copy_idx"),
        )
        .orderBy(id_col, "copy_idx")
    )


# --- token n-grams (word-level, positional) --------------------------------
#
# Character shingles (portable.shingles_*) serve MinHash; the Gopher-style
# corpus-quality metrics below need WORD n-grams with their positions kept
# (coverage is a fraction of positions, so duplicates within a doc count).


def _token_ngrams(text_col: str, n: int) -> Column:
    """Array of word n-grams (space-joined), one per start position.

    CASE-guarded like :func:`_bigrams`: Spark's ``sequence(1, 0)`` yields a
    DESCENDING ``[1, 0]`` (not an empty list), and ``slice(toks, 0, n)``
    then throws INVALID_PARAMETER_VALUE.START — so any doc with fewer than
    ``n`` tokens must short-circuit to an empty gram array (matching
    DuckDB's ``range``, which IS empty at upper bound 0).
    """
    toks = _NGRAM_TOKS.format(t=text_col)
    return F.expr(
        f"CASE WHEN size({toks}) >= {n} THEN "
        f"transform(sequence(1, size({toks}) - {n - 1}), "
        f"p -> concat_ws(' ', slice({toks}, p, {n}))) "
        f"ELSE cast(array() as array<string>) END"
    )


_NGRAM_TOKS = "split(trim({t}), '\\\\s+')"


def gopher_quality(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_tokens: int = 30,
    max_tokens: int = 100_000,
    min_mean_tok_len: float = 3.0,
    max_mean_tok_len: float = 10.0,
    min_stop_frac: float = 0.02,
    min_distinct_ratio: float = 0.35,
    known_partitions: int | None = None,
) -> DataFrame:
    """Gopher-style per-document quality rules (Rae et al. 2021 §A1.1):
    token-count bounds, mean-word-length band, stopword presence, and a
    repetition guard (distinct-token ratio).  One projection pass, all
    JVM expressions — the shape is a trivially parallel map at 100 TB.

    All ratios are single IEEE divisions of exact integers, so the DuckDB
    oracle reproduces them bit-for-bit.

    ``known_partitions``: callers that already control the input's
    partitioning (e.g. an explicit ``repartitionByRange`` whose ORDER the
    caller completes with ``sortWithinPartitions`` afterwards) MUST pass
    their known width so the internal :func:`spread` no-ops by
    construction.  Without it, spread falls back to a plan-shape width
    probe — fine as a perf heuristic, but an order-sensitive caller
    must not let a heuristic decide whether a round-robin reshuffle
    (which would destroy the range partitioning, silently) happens.
    """
    from agile_lakehouse_spark.operators.dedup import spread

    # the per-doc expressions (tokenize + stopword filter + distinct) are
    # the cost; on a narrow input (one small file) they'd run on one core.
    # spread() is a no-op on already-wide inputs, so at cluster scale this
    # adds nothing while a 1-partition local read gains full parallelism.
    df = spread(df, known_partitions=known_partitions)
    toks = _tokens(text_col)
    n_tok = F.size(toks).cast("bigint")
    # total non-whitespace chars / token count = mean token length
    tot_chars = F.length(F.regexp_replace(F.col(text_col), r"\s", "")).cast("bigint")
    mean_len = tot_chars.cast("double") / n_tok.cast("double")
    stop_arr = F.array(*[F.lit(w) for w in STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t))).cast("bigint")
    stop_frac = n_stop.cast("double") / n_tok.cast("double")
    n_distinct = F.size(F.array_distinct(toks)).cast("bigint")
    distinct_ratio = n_distinct.cast("double") / n_tok.cast("double")
    keep = (
        (n_tok >= min_tokens)
        & (n_tok <= max_tokens)
        & (mean_len >= min_mean_tok_len)
        & (mean_len <= max_mean_tok_len)
        & (stop_frac >= min_stop_frac)
        & (distinct_ratio >= min_distinct_ratio)
    )
    return df.select(
        F.col(id_col),
        n_tok.alias("n_tokens"),
        round4(mean_len).alias("mean_tok_len"),
        round4(stop_frac).alias("stop_frac"),
        round4(distinct_ratio).alias("distinct_ratio"),
        keep.alias("keep"),
    )


def dup_ngram_coverage(
    df: DataFrame,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Duplicated n-gram coverage (Gopher §A1.1 repetition signal, corpus
    edition): per document, the fraction of word-n-gram START POSITIONS
    whose n-gram also occurs in at least one OTHER document.  High
    coverage = boilerplate / templated / copied text.

    Plan: explode positional n-grams -> document-frequency per gram (one
    hash agg, map-side combined) -> join frequencies back to the exploded
    stream (both sides shuffle on the gram key, AQE reuses the exchange as
    in the rare-bigram query) -> per-doc aggregate.  Never all-pairs; the
    gram-key join fan-out is bounded by document frequency, and a
    ``max_doc_freq``-style cap is unnecessary because the per-gram payload
    after the agg is one row per (gram, doc), not the cross product.
    """
    from agile_lakehouse_spark.operators.dedup import spread

    base = spread(df.select(F.col(id_col), F.col(text_col)))
    grams = base.select(
        F.col(id_col), F.explode(_token_ngrams(text_col, n)).alias("gram")
    )
    # collapse the positional stream to (doc, gram, position-count) FIRST:
    # the doc-frequency stage becomes a plain count of pair rows (no
    # countDistinct expansion) and the join back moves distinct pairs,
    # not positions — measured 39 s -> ~8 s at 100k synthetic docs
    pairs = grams.groupBy(id_col, "gram").agg(F.count(F.lit(1)).alias("cnt"))
    gram_df = pairs.groupBy("gram").agg(F.count(F.lit(1)).cast("bigint").alias("gram_docs"))
    per_doc = (
        pairs.join(gram_df, "gram")
        .groupBy(id_col)
        .agg(
            F.sum("cnt").cast("bigint").alias("n_pos"),
            F.sum(F.when(F.col("gram_docs") > 1, F.col("cnt")).otherwise(0))
            .cast("bigint")
            .alias("n_dup_pos"),
        )
    )
    return (
        df.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_pos", F.lit(0)).cast("bigint").alias("n_pos"),
            F.coalesce("n_dup_pos", F.lit(0)).cast("bigint").alias("n_dup_pos"),
            round4(
                F.when(
                    F.coalesce("n_pos", F.lit(0)) > 0,
                    F.coalesce("n_dup_pos", F.lit(0)).cast("double") / F.col("n_pos").cast("double"),
                ).otherwise(F.lit(0.0))
            ).alias("dup_frac"),
        )
        .orderBy(id_col)
    )


def corpus_mixture(
    df: DataFrame,
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Training-mixture summary: per source, document and token counts,
    token share of the corpus, and the cumulative share in descending
    token order (the "how many sources cover 90% of the tokens" view a
    mixture designer reads first).

    Shares divide EXACT integer token sums (cumulative sum runs on the
    integers, one IEEE division at the end), so the result is independent
    of partitioning and shuffle order — and bit-identical in the oracle.
    """
    from pyspark.sql.window import Window

    per_source = (
        df.select(F.col(source_col), F.size(_tokens(text_col)).cast("bigint").alias("n_tok"))
        .groupBy(source_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_tok").cast("bigint").alias("n_tokens"),
        )
    )
    total = Window.partitionBy()
    order = Window.partitionBy().orderBy(F.desc("n_tokens"), F.asc(source_col)).rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        per_source.withColumn("total_tokens", F.sum("n_tokens").over(total))
        .withColumn("cum_tokens", F.sum("n_tokens").over(order))
        .select(
            source_col,
            "n_docs",
            "n_tokens",
            round4(F.col("n_tokens").cast("double") / F.col("total_tokens").cast("double")).alias(
                "token_share"
            ),
            round4(F.col("cum_tokens").cast("double") / F.col("total_tokens").cast("double")).alias(
                "cum_share"
            ),
        )
        .orderBy(F.desc("n_tokens"), F.asc(source_col))
    )


def train_val_test_split(
    df: DataFrame,
    val_pct: int = 10,
    test_pct: int = 10,
    id_col: str = "doc_id",
    strata_col: str = "lang",
) -> DataFrame:
    """Deterministic 3-way corpus split (DQ131): every document lands in
    train/val/test as a pure function of its id (portable md5-fold hash
    mod 100), so the split is stable across engines, partition layouts,
    cluster sizes, AND reruns — the property that makes a training-data
    split auditable.  Seeded ``randomSplit`` has none of these.

    Output: per (stratum, split) counts — the table a dataset card
    publishes.  One pass, conditional aggregation.
    """
    from agile_lakehouse_spark.functions import portable

    h = F.expr(portable.hex15_spark(f"CAST({id_col} AS STRING)")) % 100
    split = (
        F.when(h < test_pct, F.lit("test"))
        .when(h < test_pct + val_pct, F.lit("val"))
        .otherwise(F.lit("train"))
    )
    return (
        df.select(F.col(strata_col).alias("stratum"), split.alias("split"))
        .groupBy("stratum", "split")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
        .orderBy("stratum", "split")
    )


# --- PII redaction -----------------------------------------------------------
#
# Training-corpus scrubbing: replace e-mail / phone / IPv4 literals with
# typed placeholder tokens and count what was removed.  Patterns stay in
# the Java-regex ∩ RE2 common subset (no lookaround, no backrefs) so the
# DuckDB oracle replays them exactly; counts come from
# ``regexp_extract_all(..., 0)`` on the ORIGINAL text, replacement is
# sequential (e-mail -> phone -> IP) on one projection.

PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    "phone": (r"\+[0-9]{1,2}-[0-9]{3}-[0-9]{4}", "<PHONE>"),
    "ip": (r"([0-9]{1,3}\.){3}[0-9]{1,3}", "<IP>"),
}


def redact_pii(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Append per-type redaction counts and a ``redacted`` text column.

    One pure projection — three ``regexp_replace`` (JVM, codegen) chained
    in dict order plus three match-counts; no shuffle, trivially
    map-parallel at any scale.
    """
    out = df
    redacted = F.col(text_col)
    for name, (pat, token) in PII_PATTERNS.items():
        out = out.withColumn(
            f"n_{name}s",
            F.size(F.regexp_extract_all(F.col(text_col), F.lit(pat), F.lit(0))).cast("bigint"),
        )
        redacted = F.regexp_replace(redacted, pat, token)
    return out.withColumn("redacted", redacted)


# --- token-budget mixture fill ----------------------------------------------


def fill_token_budget(
    df: DataFrame,
    budgets: dict[str, int],
    n_buckets: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
) -> DataFrame:
    """Fill each source's TOKEN budget deterministically: order each
    source's documents by a portable hash of their id (a seedless,
    engine-reproducible shuffle) and keep the prefix whose cumulative
    token count stays within the budget — how a training mixture's
    "300 B tokens of web, 50 B of code" spec becomes a concrete document
    set.

    Semantics == one global window per source (cumsum over hash order,
    keep ``cum <= budget``), but computed in TWO PHASES so no window ever
    sees a whole source (a per-source window shuffles 100 TB onto a
    handful of partitions — the classic low-cardinality-key skew):

    1. bucket = top bits of the hash (a PREFIX of the order key, so
       buckets are contiguous runs of the order); per-(source, bucket)
       token sums — a tiny aggregate (sources x n_buckets rows) — let the
       driver prefix-sum to find each source's CUT bucket and the budget
       remaining inside it.
    2. buckets before the cut are kept whole (no window at all); ONLY the
       cut bucket runs the exact cumsum window, over ~1/n_buckets of one
       source.

    Raise ``n_buckets`` (power of two) as sources grow: the windowed
    fraction shrinks as 1/n_buckets while phase 1 stays tiny.
    """
    import math

    from pyspark.sql import Window

    assert n_buckets & (n_buckets - 1) == 0 and 0 < n_buckets <= 2**30
    shift = 2 ** (60 - int(math.log2(n_buckets)))  # hex15 yields 60 bits
    h = F.expr(portable.hex15_spark(f"CAST({id_col} AS STRING)"))
    toks = F.expr(portable.tokens_spark(text_col))
    n_tok = F.when(
        (F.size(toks) == 1) & (F.element_at(toks, 1) == ""), F.lit(0)
    ).otherwise(F.size(toks)).cast("bigint")
    base = df.select(
        F.col(id_col),
        F.col(source_col).alias("source"),
        n_tok.alias("n_tokens"),
        h.alias("_h"),
    ).withColumn("_bucket", F.expr(f"_h div {shift}"))

    sums = {
        (r["source"], r["_bucket"]): r["tok_sum"]
        for r in base.groupBy("source", "_bucket")
        .agg(F.sum("n_tokens").alias("tok_sum"))
        .collect()
    }
    full_pred, cut_info = F.lit(False), []
    for src, budget in budgets.items():
        acc = 0
        for b in range(n_buckets):
            s = sums.get((src, b), 0)
            if acc + s <= budget:
                acc += s
                continue
            # b is the cut bucket; budget remaining inside it: budget - acc
            full_pred = full_pred | (
                (F.col("source") == src) & (F.col("_bucket") < b)
            )
            cut_info.append((src, b, budget - acc))
            break
        else:  # whole source fits
            full_pred = full_pred | (F.col("source") == src)

    kept_full = base.filter(full_pred)
    parts = [kept_full]
    if cut_info:
        cut_pred = F.lit(False)
        rem_map = F.lit(None).cast("bigint")
        for src, b, rem in cut_info:
            cut_pred = cut_pred | ((F.col("source") == src) & (F.col("_bucket") == b))
            rem_map = F.when((F.col("source") == src), F.lit(rem)).otherwise(rem_map)
        w = (
            Window.partitionBy("source")
            .orderBy(F.col("_h").asc(), F.col(id_col).asc())
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        in_cut = base.filter(cut_pred).withColumn("_cum", F.sum("n_tokens").over(w))
        parts.append(in_cut.filter(F.col("_cum") <= rem_map).drop("_cum"))
    out = parts[0] if len(parts) == 1 else parts[0].unionByName(parts[1])
    return (
        out.select(
            F.col(id_col).cast("bigint").alias(id_col),
            "source",
            F.col("n_tokens"),
        )
        .orderBy(id_col)
    )


def lm_fluency(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    add_k: float = 0.5,
    persist_toks: bool = True,
    caches: list | None = None,
) -> DataFrame:
    """Corpus-LM fluency scoring — the CCNet quality-filter shape
    (Wenzek et al. 2020: score each document under a language model and
    filter/bucket by score), with the model trained ON the corpus
    itself as an add-k-smoothed bigram model.

    Per-document score = the MEAN transition probability
    ``P(w2|w1) = (c2(w1,w2) + k) / (c1(w1) + k*V)`` over the document's
    adjacent token pairs.  Deliberately a RATIONAL mean probability,
    not mean log-prob: ``ln`` is not correctly rounded and diverges
    between engines in the last ulp (the dq37 idf lesson), while this
    form is plain IEEE arithmetic the DuckDB oracle reproduces exactly.
    A production deployment wanting true perplexity exponentiates
    per-doc mean log-probs — same plan shape, one extra ``ln``.

    Plan at 100 TB: the input is scanned + tokenized + spread ONCE —
    ``toksed`` feeds three branches (transition pairs twice, the
    unigram model once), so it is persisted for the job
    (``persist_toks``, the :func:`minhash_near_dup` compute-once
    pattern; at cluster scale a checkpointed token table plays the
    same role).  The two count models are hash aggs (map-side
    combined), scoring is two bounded-key joins (bigram, unigram) +
    one per-doc agg.  V (vocabulary size) is derived FROM the unigram
    model — a 1-row count over the vocabulary-sized (persisted) ``c1``
    table broadcast into the projection, never a second full-corpus
    ``countDistinct`` pass and never collected.

    Returns (doc_id, n_transitions, fluency); docs with < 2 tokens have
    0 transitions and fluency 0.0.

    Cache lifetime: the lazy return means this function cannot unpersist
    for you.  Long-lived sessions scoring many corpora should pass a
    ``caches`` list — every frame persisted here is appended to it, so
    the caller can ``[c.unpersist() for c in caches]`` after
    materializing (the graph.py discipline) instead of leaking a
    corpus-sized token cache per call until LRU eviction thrashes.
    """
    from agile_lakehouse_spark.operators.dedup import _spread_tokens

    toksed = _spread_tokens(df, text_col, id_col)
    if persist_toks:
        if caches is None:
            import warnings

            warnings.warn(
                "lm_fluency(persist_toks=True, caches=None) persists a "
                "corpus-sized token table and a unigram table it cannot "
                "unpersist (lazy return); pass a caches= list and "
                "unpersist after materializing, or persist_toks=False",
                ResourceWarning,
                stacklevel=2,
            )
        toksed = toksed.persist()
        if caches is not None:
            caches.append(toksed)
    pairs = toksed.select(
        F.col(id_col),
        F.explode(
            F.expr(
                "CASE WHEN size(_toks) >= 2 THEN "
                "transform(sequence(1, size(_toks) - 1), "
                "p -> struct(element_at(_toks, p) AS w1, element_at(_toks, p + 1) AS w2)) "
                "ELSE cast(array() as array<struct<w1:string,w2:string>>) END"
            )
        ).alias("t"),
    ).select(id_col, F.col("t.w1").alias("w1"), F.col("t.w2").alias("w2"))
    c2 = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    toks = toksed.select(id_col, F.explode("_toks").alias("w"))
    c1 = toks.groupBy(F.col("w").alias("w1")).agg(F.count(F.lit(1)).alias("c1"))
    if persist_toks:
        # c1 feeds the scoring join AND the vocabulary count; it is
        # vocabulary-sized (tiny next to the corpus), so persisting it
        # makes the V derivation a free 1-row count over the cache
        c1 = c1.persist()
        if caches is not None:
            caches.append(c1)
    # V = number of distinct tokens = number of rows in the unigram
    # model (every token occurs as w1 in c1) — no separate corpus pass
    vocab = c1.agg(F.count(F.lit(1)).alias("_v"))
    p = (F.col("c2") + F.lit(add_k)) / (
        F.col("c1") + F.lit(add_k) * F.col("_v")
    )
    scored = (
        pairs.join(c2, ["w1", "w2"])
        .join(c1, "w1")
        .crossJoin(F.broadcast(vocab))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_transitions"),
            round4(F.avg(p)).alias("fluency"),
        )
    )
    return (
        df.select(F.col(id_col).cast("bigint").alias(id_col))
        .join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_transitions", F.lit(0)).cast("bigint").alias("n_transitions"),
            F.coalesce("fluency", F.lit(0.0)).alias("fluency"),
        )
        .orderBy(id_col)
    )
