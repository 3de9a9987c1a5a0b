"""Scaling evidence for the LLM-pipeline family: run exact dedup,
MinHash+LSH near-dup, SimHash near-dup, and the Gopher quality filter
over a SYNTHETIC corpus far beyond fixture scale (sf0.1 = 5k docs;
default here 20k/100k/500k) and report docs/sec so fixed job costs are
visible separately from throughput.

The corpus is generated distributed (spark.range + hash arithmetic —
no driver data, no RNG): ~1000-word vocabulary, 40-99 tokens/doc, and
1-in-50 documents is a near-copy of its predecessor differing by one
trailing token, so the near-dup operators find real pairs at every
scale instead of degenerating to the no-candidates fast path.  Token
dispersion uses xxhash64 — a linear-congruential token stream repeats
every |prime| seeds, silently cloning documents at 100k+ docs and
exploding the candidate joins (found the hard way).

    python scripts/scaling_dedup.py [n_docs ...]

Prints one JSON line per scale (SCALE.md records representative runs).
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from agile_lakehouse_spark import get_session
from agile_lakehouse_spark.operators import dedup, text


def synth_docs(spark, n: int):
    """Deterministic synthetic corpus with planted near-duplicates.

    Doc ids i with i % 50 == 1 reuse the seed of doc i-1 and append one
    extra token — a guaranteed near-dup pair per 50 docs.  Token t of
    seed s = w{(s*2654435761 + t*69069 + 13) % 1009 % 1000}, materialized
    with transform(sequence(...)) + concat_ws: pure JVM expressions, rows
    generated in place on executors.
    """
    base = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 50 == 1, F.col("id") - 1).otherwise(F.col("id")).alias("seed"),
    )
    tok = (
        "transform(sequence(1, CAST(40 + seed % 60 AS INT)), "
        "t -> CASE WHEN t % 17 = 0 THEN 'the' WHEN t % 23 = 0 THEN 'a' "
        "ELSE concat('w', CAST(pmod(xxhash64(seed, t), 10000) AS STRING)) END)"
    )
    return base.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 50 == 1,
            F.concat_ws(" ", F.expr(tok), F.lit("variant")),
        )
        .otherwise(F.concat_ws(" ", F.expr(tok)))
        .alias("text"),
    )


def run_scale(spark, n: int) -> dict:
    out: dict[str, object] = {"n_docs": n}
    docs = synth_docs(spark, n).persist()
    n_rows = docs.count()  # materialize the corpus before timing operators
    assert n_rows == n

    t0 = time.time()
    kept = dedup.exact_dedup(docs).count()
    out["exact_s"] = round(time.time() - t0, 2)
    out["exact_kept"] = kept

    t0 = time.time()
    pairs = dedup.minhash_near_dup(docs, k=5, threshold=0.5).count()
    out["minhash_s"] = round(time.time() - t0, 2)
    out["minhash_pairs"] = pairs

    # AUTO-width signatures (round 4): the occupancy rule picks the chunk
    # width from the corpus count (32-bit at fixture scale, 64-bit at
    # 100k, 80-bit at 2M), replacing the hand-tuned 60-bit knob the
    # round-3 ladder showed saturating at 500k docs (72.4 s).  >60 bits
    # switches to the chunk-word signature representation.
    t0 = time.time()
    bits = dedup.auto_simhash_bits(n)
    spairs = dedup.simhash_near_dup(docs, max_hamming=3, bits=bits, chunks=4).count()
    out["simhash_s"] = round(time.time() - t0, 2)
    out["simhash_bits"] = bits
    out["simhash_pairs"] = spairs

    t0 = time.time()
    q = text.gopher_quality(docs).filter("keep").count()
    out["gopher_s"] = round(time.time() - t0, 2)
    out["gopher_kept"] = q

    # corpus-wide duplicated-8-gram coverage: explode + doc-freq join
    t0 = time.time()
    cov = text.dup_ngram_coverage(docs, n=8).filter("n_dup_pos > 0").count()
    out["dupcov_s"] = round(time.time() - t0, 2)
    out["dupcov_docs"] = cov

    # paragraph-level span dedup (round 4): explode to 8-token windows,
    # first-occurrence window over the paragraph hash, reassemble
    t0 = time.time()
    para = dedup.dedup_paragraphs(docs, para_tokens=8)
    touched = para.filter("n_kept < n_paras").count()
    out["para_s"] = round(time.time() - t0, 2)
    out["para_docs_touched"] = touched

    # exact duplicated-substring spans (round 5, Lee et al. 2022 shape):
    # overlapping 12-token windows, global window count, island merge
    t0 = time.time()
    spans = dedup.duplicate_spans(docs, window_tokens=12).count()
    out["spans_s"] = round(time.time() - t0, 2)
    out["spans_found"] = spans

    docs.unpersist()
    for op in ("exact", "minhash", "simhash", "gopher", "dupcov", "para", "spans"):
        out[f"{op}_docs_per_s"] = round(n / out[f"{op}_s"], 0)
    return out


def run_scale_big(spark, n: int) -> dict:
    """The 10 M-doc decade (round-7 verdict task 9) for the two newest
    operators only — the full ladder's quadratic-ish siblings (MinHash,
    SimHash, dup-coverage) already have their own measured decades:

    - ``duplicate_spans(hash_grams=True)`` — the 100 TB exchange-diet
      path; planted-duplicate RECOVERY asserted exactly (every 1-in-50
      planted near-copy shares its predecessor's full token stream, so
      both members carry one duplicated span: 2 * n/50 spans).
    - ``lm_fluency`` — corpus-bigram scoring after the round-7
      single-pass fix; EXACTNESS asserted against the corpus itself
      (sum of n_transitions == sum over docs of max(len(toks)-1, 0),
      computed independently from the raw text).
    """
    out: dict[str, object] = {"n_docs": n, "mode": "big"}
    docs = synth_docs(spark, n).persist()
    assert docs.count() == n

    t0 = time.time()
    spans = dedup.duplicate_spans(docs, window_tokens=12, hash_grams=True).count()
    out["spans_hash_s"] = round(time.time() - t0, 2)
    out["spans_found"] = spans
    # planted pairs are docs i with i % 50 == 1 (paired with i-1), i.e.
    # i in {1, 51, 101, ...} ∩ [0, n) -> (n-2)//50 + 1 of them for n >= 2
    # (NOT n//50, which undercounts whenever n isn't a multiple of 50);
    # each pair yields one duplicated span in BOTH members
    n_planted = (n - 2) // 50 + 1 if n >= 2 else 0
    expected = 2 * n_planted
    assert spans == expected, f"planted recovery broke: {spans} != {expected}"

    t0 = time.time()
    scored = text.lm_fluency(docs)
    agg = scored.agg(
        F.count(F.lit(1)).alias("rows"), F.sum("n_transitions").alias("trans")
    ).collect()[0]
    out["lm_fluency_s"] = round(time.time() - t0, 2)
    out["lm_rows"], out["lm_transitions"] = agg.rows, int(agg.trans)
    truth = docs.select(
        F.greatest(
            F.size(F.expr("split(trim(text), '\\\\s+')")) - 1, F.lit(0)
        ).alias("t")
    ).agg(F.sum("t")).collect()[0][0]
    assert agg.rows == n and int(agg.trans) == int(truth), (
        f"lm_fluency exactness broke: {agg.rows}/{n} rows, "
        f"{agg.trans} vs {truth} transitions"
    )

    docs.unpersist()
    for op in ("spans_hash", "lm_fluency"):
        out[f"{op}_docs_per_s"] = round(n / out[f"{op}_s"], 0)
    return out


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--big"]
    big = "--big" in sys.argv[1:]
    sizes = [int(a) for a in args] or ([10_000_000] if big else [20_000, 100_000, 500_000])
    spark = get_session("scaling-dedup")
    spark.sparkContext.setLogLevel("ERROR")
    for n in sizes:
        print(json.dumps((run_scale_big if big else run_scale)(spark, n)), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
