"""Training-data pipeline queries (dedup / similarity / text analysis /
multimodal) with DuckDB oracles where SQL can express them.

Non-SQL-expressible entries (xxh3 minhash/simhash signatures, LSH
buckets, winnowing fingerprints) get rows-only driver checks; their
exact semantics are locked by pytest instead (tests/test_dedup.py,
tests/test_similarity.py compare against brute-force recomputation).
"""

from __future__ import annotations

from collections.abc import Callable

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rxtls_spark.functions.hashing import KNUTH_A, KNUTH_P, knuth_hash
from rxtls_spark.functions.text import (
    LANG_MARKERS,
    LANG_PRIORITY,
    lang_guess,
    quality_features,
    quality_score,
    round3_stable,
    round5_stable,
    token_count,
)
from rxtls_spark.operators.dedup import (
    exact_dup_groups,
    minhash_near_dups,
    normalized_dup_groups,
    simhash_near_dups,
    with_injected_dups,
)
from rxtls_spark.operators.multimodal import (
    media_df,
    media_feature_counts,
    sample_frames,
)
from rxtls_spark.operators.similarity import (
    _cosine_cols,
    ann_lsh_topk,
    brute_force_topk,
    embedding_stats,
    query_set,
)


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


# --- text analysis -----------------------------------------------------------

def q_text_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    f = quality_features()
    return _docs(spark, sf_dir).select(
        "doc_id",
        f["n_chars"].alias("n_chars"),
        token_count().alias("n_tokens"),
        F.round(f["alpha_ratio"], 5).alias("alpha_ratio"),
        quality_score().alias("quality"),
        lang_guess().alias("lang_guess"),
    )


def q_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer surface: whitespace count, BPE-ish regex count, and
    stopword ratio — all pure Catalyst, SQL-mirrored."""
    from rxtls_spark.functions.text import stopword_ratio, token_count_bpe

    return _docs(spark, sf_dir).select(
        "doc_id",
        token_count().alias("n_tokens_ws"),
        token_count_bpe().alias("n_tokens_bpe"),
        F.round(stopword_ratio(), 5).alias("stopword_ratio"),
    )


def with_injected_pii(docs: DataFrame) -> DataFrame:
    """Deterministic PII injection (every doc_id%10==0 gets an email,
    an IPv4 and a phone appended) — mirrored in the SQL oracle, since
    the synthetic documents may contain no organic PII."""
    pii = F.concat(
        F.col("text"),
        F.lit(" Contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com from 10.0."),
        (F.col("doc_id") % 250).cast("string"),
        F.lit(".7 call +12 3456 7890."),
    )
    return docs.withColumn(
        "text", F.when(F.col("doc_id") % 10 == 0, pii).otherwise(F.col("text"))
    )


def q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction over the corpus: per-class match counts on the raw
    text plus the md5 of the scrubbed text — the full scrub output is
    value-checked without shipping megabytes through the compare.  All
    JVM-side regexp_count/regexp_replace; patterns are chosen so Java
    regex and RE2 match identically (no lookarounds/backrefs)."""
    from rxtls_spark.functions.text import pii_counts, pii_scrub

    docs = with_injected_pii(_docs(spark, sf_dir).select("doc_id", "text"))
    c = pii_counts()
    return docs.select(
        "doc_id",
        c["n_emails"].alias("n_emails"),
        c["n_ipv4"].alias("n_ipv4"),
        c["n_phones"].alias("n_phones"),
        F.md5(pii_scrub()).alias("scrubbed_md5"),
    )


# k-anonymity / l-diversity audit constants — MIRRORED in the
# `k_anonymity` oracle SQL; change together.  QI = (source, lang,
# n_chars DIV KANON_LEN_BUCKET); the sensitive attribute is the
# synthetic author cohort knuth_hash(doc_id) % KANON_AUTHORS (stands
# in for the author/user column a real corpus carries).  The verdict
# CASE order IS the semantics (the filter_cascade rule).
K_ANON = 5
L_DIV = 3
KANON_LEN_BUCKET = 200
KANON_AUTHORS = 97


def q_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity + l-diversity release audit (Sweeney 2002;
    Machanavajjhala et al. 2007) — the privacy gate a corpus release
    runs AFTER `pii_scrub`: scrubbing removes direct identifiers, but
    a quasi-identifier combination (source, lang, length bucket) that
    isolates fewer than k documents, or whose group exposes fewer
    than l distinct sensitive values, still re-identifies.  Emits
    every QI equivalence class with its size, its sensitive-value
    diversity, and the release verdict ('ok' / 'suppress').

    Cross-engine: the QI bucket and the synthetic author cohort are
    exact integer formulas (knuth_hash flows in); counts are BIGINTs;
    the verdict CASE order is mirrored.

    Scale shape: ONE (QI) hash agg with count + exact distinct-author
    count — the distinct's second shuffle is over (QI, author) keys
    bounded by |QI classes|·KANON_AUTHORS, metadata-scale at any
    corpus size once authors are bucketed."""
    docs = _docs(spark, sf_dir).select(
        "source",
        "lang",
        F.expr(f"n_chars DIV {KANON_LEN_BUCKET}").cast("long").alias(
            "len_bucket"
        ),
        (knuth_hash(F.col("doc_id")) % KANON_AUTHORS).alias("author"),
    )
    g = docs.groupBy("source", "lang", "len_bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.countDistinct("author").cast("long").alias("n_authors"),
    )
    return g.select(
        "source",
        "lang",
        "len_bucket",
        "n_docs",
        "n_authors",
        F.when(F.col("n_docs") < K_ANON, F.lit("suppress_k"))
        .when(F.col("n_authors") < L_DIV, F.lit("suppress_l"))
        .otherwise(F.lit("ok"))
        .alias("verdict"),
    )


# t-closeness spec — MIRRORED in `_t_closeness_sql`; change together.
# QI classes are the k_anonymity (source, lang, len_bucket) triple
# (KANON_LEN_BUCKET flows in); the sensitive attribute is the ordinal
# quality_bucket(); distance is the ordinal EMD Σ|ΔCDF|/(m−1) of Li
# 2007 §4 on e9 integer CDFs.  The threshold is sized so BOTH
# verdicts populate on the synthetic corpus (small QI classes drift
# far from the global quality distribution) — retune with the data
# model.
T_CLOSE_E9 = 250_000_000


def q_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness release audit (Li, Li & Venkatasubramanian 2007) —
    the third privacy gate after `k_anonymity`'s k/l checks: a QI
    class can be large AND diverse yet still leak if its SENSITIVE-
    ATTRIBUTE distribution differs sharply from the corpus-wide one
    (the skew attack l-diversity misses).  Sensitive attribute =
    the ordinal quality bucket; per QI class the ordinal EMD
    (Li §4: Σ|CDF_class − CDF_global| over the m observed buckets,
    normalized by m−1, last bucket's zero term excluded via rank<m)
    against the global distribution, verdict 'suppress_t' above
    ``T_CLOSE_E9``.

    Cross-engine: buckets are the exact `quality_bucket()` integers;
    CDFs the e9 integer form (cum·1e9 DIV n — the source_ks_drift
    bound); |Δ| sums ≤ (m−1)·1e9 BIGINT; final DIV (m−1) truncating
    on non-negatives.  Densified class×bucket grid (missing buckets
    coalesce 0 — the burrows grid rule).

    Scale shape: ONE corpus-scale hash agg to (QI × ≤1001) rows;
    the global histogram window is a single ≤1001-row partition; the
    grid/cum/EMD stages are metadata-scale.  The class CDF window
    partitions by QI — bounded partitions, no skew."""
    from pyspark.sql.window import Window

    scored = _docs(spark, sf_dir).select(
        "source",
        "lang",
        F.expr(f"n_chars DIV {KANON_LEN_BUCKET}").cast("long").alias(
            "len_bucket"
        ),
        quality_score().alias("quality"),
    )
    hist = scored.groupBy(
        "source", "lang", "len_bucket", quality_bucket().alias("qb")
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    tot = hist.groupBy("source", "lang", "len_bucket").agg(
        F.sum("c").cast("long").alias("n_docs")
    )
    gb = hist.groupBy("qb").agg(F.sum("c").cast("long").alias("cg"))
    wg = Window.orderBy("qb")
    wall = Window.partitionBy()
    gcdf = gb.select(
        "qb",
        F.row_number().over(wg).cast("long").alias("idx"),
        F.count(F.lit(1)).over(wall).cast("long").alias("m"),
        F.expr(
            "(sum(cg) OVER (ORDER BY qb) * 1000000000)"
            " DIV sum(cg) OVER ()"
        ).alias("cdf_g"),
    )
    grid = tot.crossJoin(F.broadcast(gcdf))
    cum = (
        grid.join(hist, ["source", "lang", "len_bucket", "qb"], "left")
        .select(
            "source",
            "lang",
            "len_bucket",
            "n_docs",
            "qb",
            "idx",
            "m",
            "cdf_g",
            F.coalesce("c", F.lit(0).cast("long")).alias("c0"),
        )
        .withColumn(
            "cum",
            F.sum("c0")
            .over(
                Window.partitionBy("source", "lang", "len_bucket").orderBy(
                    "qb"
                )
            )
            .cast("long"),
        )
    )
    per = cum.select(
        "source",
        "lang",
        "len_bucket",
        "n_docs",
        "m",
        F.expr(
            "CASE WHEN idx < m THEN"
            " abs((cum * 1000000000) DIV n_docs - cdf_g)"
            " ELSE CAST(0 AS BIGINT) END"
        ).alias("d"),
    )
    agg = per.groupBy("source", "lang", "len_bucket").agg(
        F.max("n_docs").cast("long").alias("n_docs"),
        F.max("m").cast("long").alias("m"),
        F.sum("d").cast("long").alias("sum_d"),
    )
    return agg.select(
        "source",
        "lang",
        "len_bucket",
        "n_docs",
        F.expr(
            "CASE WHEN m > 1 THEN sum_d DIV (m - 1)"
            " ELSE CAST(0 AS BIGINT) END"
        ).alias("emd_e9"),
        F.expr(
            "CASE WHEN (CASE WHEN m > 1 THEN sum_d DIV (m - 1)"
            f" ELSE CAST(0 AS BIGINT) END) > {T_CLOSE_E9}"
            " THEN 'suppress_t' ELSE 'ok' END"
        ).alias("verdict"),
    )


def q_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination detection: flag corpus documents sharing
    any word-3-gram with the eval set (doc_id%50==0 plays the held-out
    benchmark).  Scale shape: the eval shingle set is DISTINCT and
    BROADCAST (eval sets are tiny vs the corpus), the corpus side is a
    map-side explode + broadcast hash join, and the only shuffle is the
    final per-doc partial-agg count.  array_distinct before the explode
    makes count(*) == count(DISTINCT shingle) without a second shuffle."""
    docs = _docs(spark, sf_dir).select("doc_id", "text")
    ev = (
        docs.where(F.col("doc_id") % 50 == 0)
        .select(F.explode(_word_shingles(F.col("text"))).alias("shingle"))
        .distinct()
    )
    corpus = docs.where(F.col("doc_id") % 50 != 0).select(
        "doc_id",
        F.explode(F.array_distinct(_word_shingles(F.col("text")))).alias(
            "shingle"
        ),
    )
    return (
        corpus.join(F.broadcast(ev), "shingle")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
    )


def q_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holdout-split leakage audit — `contamination` pointed at the
    pipeline's OWN train/val/test boundary: for every val/test
    document, how many TRAIN documents share a word-3-gram shingle
    with it, and how many of its distinct shingles are compromised.
    The holdout_split permille rule guarantees a doc never migrates
    between splits, but near-duplicate PAIRS straddling the boundary
    still leak eval signal into training — the audit every eval-split
    release runs (and the reason real pipelines dedup BEFORE
    splitting).

    Cross-engine: splits are the knuth permille rule (holdout
    constants flow in), shingles the shared `_word_shingles` /
    `_shingles_sql` pair, outputs pure BIGINT distinct counts.

    Scale shape: the eval side is a bounded permille slice — its
    distinct shingle set broadcasts (the contamination convention);
    the train side is a map-side explode into the broadcast join; the
    only shuffle is the per-eval-doc distinct agg.  A pathologically
    hot shingle takes the dedup.py bucket-cap guard at 100 TB."""
    docs = (
        _docs(spark, sf_dir)
        .select("doc_id", "text")
        .where(F.trim("text") != "")
        .withColumn("pm", knuth_hash(F.col("doc_id")) % 1000)
    )
    ev = docs.where(F.col("pm") >= HOLDOUT_VAL_FROM).select(
        "doc_id",
        F.when(F.col("pm") >= HOLDOUT_TEST_FROM, F.lit("test"))
        .otherwise(F.lit("val"))
        .alias("split"),
        F.explode(F.array_distinct(_word_shingles(F.col("text")))).alias(
            "shingle"
        ),
    )
    tr = docs.where(F.col("pm") < HOLDOUT_VAL_FROM).select(
        F.col("doc_id").alias("train_doc"),
        F.explode(F.array_distinct(_word_shingles(F.col("text")))).alias(
            "shingle"
        ),
    )
    return (
        tr.join(F.broadcast(ev), "shingle")
        .groupBy("doc_id", "split")
        .agg(
            F.countDistinct("train_doc").cast("long").alias("n_train_docs"),
            F.countDistinct("shingle")
            .cast("long")
            .alias("n_shared_shingles"),
        )
    )


def q_doc_chunks(spark: SparkSession, sf_dir: str, chunk: int = 64) -> DataFrame:
    """Training-sequence prep: each document's BPE-ish token stream cut
    into fixed-length chunks (the per-document half of sequence
    packing — embarrassingly parallel, no cross-doc state, so it scales
    as a pure map; cross-doc packing at 100 TB is done per shard
    downstream).  Emits (doc_id, chunk_idx, n_tokens, chunk_md5) —
    the md5 of the space-joined chunk value-checks the full token
    stream without shipping it through the compare.  Pure Catalyst:
    regexp_extract_all → transform/sequence/slice → posexplode."""
    from rxtls_spark.functions.text import BPE_PATTERN

    toks = F.regexp_extract_all(F.col("text"), F.lit(BPE_PATTERN), 0)
    docs = _docs(spark, sf_dir).select("doc_id", toks.alias("t"))
    n = F.size("t")
    n_chunks = F.ceil(n / F.lit(chunk)).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.slice(F.col("t"), i * chunk + 1, chunk),
    )
    return (
        docs.where(n > 0)
        .select("doc_id", F.posexplode(chunks).alias("chunk_idx", "c"))
        .select(
            "doc_id",
            F.col("chunk_idx").cast("long").alias("chunk_idx"),
            F.size("c").cast("long").alias("n_tokens"),
            F.md5(F.concat_ws(" ", F.col("c"))).alias("chunk_md5"),
        )
    )


def q_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality filters (Rae et al. 2021
    §A1.1): duplicate-word fraction, most-frequent-2-gram character
    fraction, repeated-3-gram character fraction.  Scale shape: pure
    per-row Catalyst (array_sort + run-length F.aggregate folds) —
    ZERO exchanges, no token-level explode/shuffle, locked by
    tests/test_plans.py.  The oracle mirrors the semantics with
    unnest + GROUP BY, which is fine at sf0.01 and exactly what would
    be wrong at 100 TB."""
    from rxtls_spark.functions.text import repetition_features, round5_stable

    r = repetition_features()
    return _docs(spark, sf_dir).select(
        "doc_id",
        r["n_words"].alias("n_words"),
        round5_stable(r["dup_word_frac"]).alias("dup_word_frac"),
        round5_stable(r["top2gram_char_frac"]).alias("top2gram_char_frac"),
        round5_stable(r["dup3gram_char_frac"]).alias("dup3gram_char_frac"),
    )


def q_sequence_pack(
    spark: SparkSession, sf_dir: str, seq_len: int = 256, n_shards: int = 8
) -> DataFrame:
    """GPT-style concat-and-chunk sequence packing: documents are
    concatenated in doc_id order and cut into fixed seq_len-token
    training sequences; emits each doc's (shard, first/last sequence,
    span).  Scale shape: packing is per-SHARD (doc_id % n_shards) —
    sequences never cross shards, so the running-offset window is
    partitionBy(shard), never a single global sort; at 100 TB shards
    map to output files and each window partition is bounded.  One
    exchange (the shard hash partitioning), everything else JVM
    window arithmetic."""
    from pyspark.sql.window import Window

    docs = (
        _docs(spark, sf_dir)
        .select("doc_id", token_count().alias("n_tokens"))
        .where(F.col("n_tokens") > 0)
        .withColumn("shard", (F.col("doc_id") % n_shards).cast("long"))
    )
    w = Window.partitionBy("shard").orderBy("doc_id")
    end = F.sum("n_tokens").over(w)
    start = end - F.col("n_tokens")
    seq_first = F.floor(start / F.lit(seq_len))
    seq_last = F.floor((end - 1) / F.lit(seq_len))
    return docs.select(
        "doc_id",
        "shard",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        seq_first.cast("long").alias("seq_first"),
        seq_last.cast("long").alias("seq_last"),
        (seq_last - seq_first + 1).cast("long").alias("n_seqs"),
    )


# Context-length grid for the packing-efficiency audit — MIRRORED in
# the `packing_efficiency` oracle SQL; change together.
PACK_CTX_GRID = (128, 256, 512)


def q_packing_efficiency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Padding-waste audit across a context-length grid — the sizing
    study a pipeline runs BEFORE committing a context length and a
    packing policy (`sequence_pack` implements the chosen policy; this
    query chooses it): for each candidate ctx, the number of training
    sequences and padding tokens under (a) doc-boundary packing
    (every doc padded up to its own ceil(n/ctx) sequences — no
    cross-doc attention contamination) and (b) concat-stream packing
    (the GPT-style sequence_pack policy — only the stream tail pads).
    The gap between the two IS the price of document isolation at
    that context length.  All exact BIGINTs (ceil-division identities,
    no floats anywhere); constants in PACK_CTX_GRID.

    Scale shape: one pure per-row map (token count) fanned out over a
    |grid|-element literal explode (map-side, partial-agg absorbed)
    into a |grid|-row agg — no window, no join; the concat-stream
    numbers derive from the same agg's token total."""
    docs = (
        _docs(spark, sf_dir)
        .select(token_count().alias("n"))
        .where(F.col("n") > 0)
        .select(
            "n",
            F.explode(
                F.array(*[F.lit(c).cast("long") for c in PACK_CTX_GRID])
            ).alias("ctx"),
        )
    )
    seqs_doc = F.expr("(n + ctx - 1) DIV ctx")
    return docs.groupBy("ctx").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n").cast("long").alias("total_tokens"),
        F.sum(seqs_doc).cast("long").alias("n_seqs_doc_bound"),
        F.sum(seqs_doc * F.col("ctx") - F.col("n"))
        .cast("long")
        .alias("pad_doc_bound"),
        F.expr("CAST((sum(n) + ctx - 1) DIV ctx AS BIGINT)").alias(
            "n_seqs_concat"
        ),
        F.expr("CAST((ctx - sum(n) % ctx) % ctx AS BIGINT)").alias(
            "pad_concat"
        ),
    )


def q_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-0.5 mixture sampling: per-language keep rate
    sqrt(c_min/c_lang), so the sampled corpus is distributed
    proportional to sqrt(c_lang) — the standard multilingual
    rebalancing move.  Per-doc decision is a DETERMINISTIC hash
    Bernoulli (Knuth multiplicative hash mod a prime), so the sample
    is reproducible and embarrassingly parallel: rates are a 5-row
    broadcast, the filter is a pure map, and the only corpus shuffle
    is the final per-lang partial agg.  Cross-engine exactness by
    construction: c_min/c_lang is an integer-ratio double and sqrt is
    IEEE correctly-rounded, so Spark and the oracle compute the
    IDENTICAL threshold — no ulp drift (this is why the rate is
    sqrt(min/c) rather than pow(p, alpha-1), whose libm results can
    differ)."""
    docs = _docs(spark, sf_dir).select("doc_id", "lang")
    counts = docs.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
    cmin = counts.agg(F.min("n_docs").alias("cmin"))
    rates = counts.crossJoin(F.broadcast(cmin)).select(
        "lang",
        "n_docs",
        F.sqrt(F.col("cmin") / F.col("n_docs")).alias("rate"),
    )
    u = knuth_hash(F.col("doc_id"))
    sampled = (
        docs.join(F.broadcast(rates.select("lang", "rate")), "lang")
        .where(u < F.col("rate") * F.lit(1000000007.0))
        .groupBy("lang")
        .agg(F.count(F.lit(1)).cast("long").alias("n_sampled"))
    )
    return (
        rates.join(F.broadcast(sampled), "lang", "left")
        .select(
            "lang",
            "n_docs",
            F.coalesce("n_sampled", F.lit(0)).cast("long").alias("n_sampled"),
            F.round("rate", 5).alias("rate"),
        )
    )


def q_quality_quantile_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style dynamic quality gate: keep each language's top
    third by quality score — the threshold ADAPTS per language instead
    of being a global constant (a fixed cut over-prunes low-resource
    languages).  percent_rank over a per-lang window; the doc_id
    tiebreak makes the ordering total, so the cut is exactly
    reproducible cross-engine.  Scale shape: one exchange (the
    per-lang window partitioning); at 100 TB the same gate runs as a
    two-pass approx_percentile + broadcast threshold instead — this
    exact-rank variant is the correctness anchor for that
    optimization.  Emits per-lang survivor stats."""
    from pyspark.sql.window import Window

    scored = _docs(spark, sf_dir).select(
        "doc_id", "lang", quality_score().alias("quality")
    )
    pr = F.percent_rank().over(
        Window.partitionBy("lang").orderBy(F.col("quality").desc(), "doc_id")
    )
    kept = scored.withColumn("pr", pr).where(F.col("pr") <= 1.0 / 3.0)
    return kept.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_kept"),
        F.round(F.min("quality"), 5).alias("min_quality"),
        F.round(F.avg("quality"), 5).alias("avg_quality"),
    )


def quality_bucket() -> F.Column:
    """Deterministic histogram bucket of the quality score: quality is
    a stable multiple of 1e-5 (round5_stable), so floor(q*1e5+0.5) is
    its EXACT integer numerator on both engines and // 100 gives one of
    ~1000 buckets with no float-edge ambiguity (never floor(q*1000),
    whose product can land an ulp under the integer)."""
    return F.expr("CAST(floor(quality * 100000 + 0.5) AS BIGINT) DIV 100")


def quality_gate_thresholds(scored: DataFrame) -> dict[str, int]:
    """Pass 1 of the scale-safe gate: per-language histogram-quantile
    threshold buckets.  The histogram is a hash agg with a BOUNDED
    output (n_langs × ≤1001 rows) regardless of corpus size — the
    collect is metadata-scale at 100 TB exactly like the IVF centroid
    matrix.  Threshold rule mirrors the exact gate's kept count
    (percent_rank ≤ 1/3 keeps (n-1)//3 + 1 docs): the largest bucket b
    with #docs-in-buckets-≥-b still covering that count."""
    hist = (
        scored.groupBy("lang", quality_bucket().alias("qb"))
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .collect()
    )
    by_lang: dict[str, dict[int, int]] = {}
    for r in hist:
        by_lang.setdefault(r["lang"], {})[int(r["qb"])] = int(r["c"])
    thresholds = {}
    for lang, buckets in by_lang.items():
        n = sum(buckets.values())
        target = (n - 1) // 3 + 1
        cum = 0
        for qb in sorted(buckets, reverse=True):
            cum += buckets[qb]
            if cum >= target:
                thresholds[lang] = qb
                break
    return thresholds


def q_quality_quantile_gate_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100-TB shape of the quality gate the exact-rank variant
    anchors: two passes, NO per-language window sort.  Pass 1 reduces
    the corpus to a bounded per-lang quality histogram and derives a
    threshold bucket per language (quality_gate_thresholds); pass 2 is
    a PURE-MAP filter against the broadcast (literal-map) thresholds
    followed by one partial-agg exchange.  The exact variant's
    per-lang `Window.partitionBy(lang)` percent_rank forces one full
    multi-TB sort chain per language at scale; here every stage is a
    hash agg over all cores.  Spark's built-in approx_percentile has
    the same two-pass shape but a sketch DuckDB can't reproduce — the
    deterministic histogram quantile keeps the driver gate hash-green.
    Agreement with the exact gate is pytest-locked (≥99% of kept docs
    identical; disagreement is confined to the threshold bucket)."""
    scored = _docs(spark, sf_dir).select(
        "doc_id", "lang", quality_score().alias("quality")
    )
    thresholds = quality_gate_thresholds(scored)
    thr_map = F.create_map(
        *[F.lit(x) for kv in sorted(thresholds.items()) for x in kv]
    )
    kept = scored.where(quality_bucket() >= thr_map[F.col("lang")])
    return kept.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_kept"),
        F.round(F.min("quality"), 5).alias("min_quality"),
        F.round(F.avg("quality"), 5).alias("avg_quality"),
        F.min(thr_map[F.col("lang")]).cast("long").alias("qb_threshold"),
    )


# Script character classes — MIRRORED in the `script_profile` oracle
# SQL (identical pattern TEXT on both engines: Java regex and RE2 both
# accept the \\x{...} range syntax; CLAUDE.md unicode discipline).
# The dominant-script CASE order IS the tie rule.
SCRIPT_CLASSES = (
    ("latin", "[A-Za-z\\x{00C0}-\\x{024F}]"),
    ("cjk", "[\\x{4E00}-\\x{9FFF}\\x{3040}-\\x{30FF}\\x{AC00}-\\x{D7AF}]"),
    ("cyrillic", "[\\x{0400}-\\x{04FF}]"),
    ("arabic", "[\\x{0600}-\\x{06FF}]"),
    ("digit", "[0-9]"),
)


def q_script_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document Unicode-script profile — the i18n routing signal
    upstream of `lang_guess` (marker words need the RIGHT script to
    even appear; a multilingual pipeline routes on script first, then
    language): counts per script class (Latin incl. extensions, CJK
    han+kana+hangul, Cyrillic, Arabic, digits), the per-mille share
    of the dominant script, and the dominant script name with the
    fixed class-order tie rule.

    Cross-engine: each count is regexp_count with the IDENTICAL
    pattern text (both Java regex and RE2 accept \\x{...}); shares
    are truncating-DIV permille on BIGINTs; the dominant CASE order
    is mirrored.  Scale shape: pure per-row Catalyst map — zero
    exchanges, no explode."""
    docs = (
        _docs(spark, sf_dir)
        .select("doc_id", "text")
        .where(F.trim("text") != "")
    )
    counted = docs.select(
        "doc_id",
        F.length("text").cast("long").alias("n_chars"),
        *[
            F.regexp_count(F.col("text"), F.lit(pat))
            .cast("long")
            .alias(f"n_{name}")
            for name, pat in SCRIPT_CLASSES
        ],
    )
    names = [n for n, _ in SCRIPT_CLASSES]
    m = F.greatest(*[F.col(f"n_{n}") for n in names])
    dom = F.lit("none")
    for n in reversed(names):
        dom = F.when((m > 0) & (F.col(f"n_{n}") == m), F.lit(n)).otherwise(
            dom
        )
    # reversed + otherwise-chaining makes the FIRST class in
    # SCRIPT_CLASSES win ties — mirrored by the SQL CASE order
    return counted.select(
        "doc_id",
        "n_chars",
        *[F.col(f"n_{n}") for n in names],
        dom.alias("dominant"),
        F.when(
            F.col("n_chars") > 0,
            F.expr(
                "(greatest("
                + ", ".join(f"n_{n}" for n in names)
                + ") * 1000) DIV n_chars"
            ),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("dom_permille"),
    )


def _script_profile_sql() -> str:
    """script_profile oracle: identical pattern text per class, the
    mirrored dominant CASE order, truncating-DIV permille."""
    counts = ",\n         ".join(
        f"CAST(len(regexp_extract_all(text, '{pat}')) AS BIGINT)"
        f" AS n_{name}"
        for name, pat in SCRIPT_CLASSES
    )
    names = [n for n, _ in SCRIPT_CLASSES]
    m = "greatest(" + ", ".join(f"n_{n}" for n in names) + ")"
    dom_case = "CASE WHEN " + m + " = 0 THEN 'none' " + " ".join(
        f"WHEN n_{n} = {m} THEN '{n}'" for n in names
    ) + " END"
    return f"""
WITH counted AS (
  SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars,
         {counts}
  FROM documents WHERE trim(text) <> ''
)
SELECT doc_id, n_chars, {', '.join('n_' + n for n in names)},
       {dom_case} AS dominant,
       CAST(CASE WHEN n_chars > 0 THEN ({m} * 1000) // n_chars
            ELSE 0 END AS BIGINT) AS dom_permille
FROM counted
"""


def q_source_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source Gini coefficient of the document-length (character
    mass) distribution — the concentration audit a curation review
    runs on every source: G near 0 means mass is spread evenly over
    documents, G near 1 means a handful of giant documents carry the
    source (scraper concatenation artifacts, dumps, logs) and
    per-document sampling rates will misbehave.  Completes the
    corpus-health fits (zipf = token frequencies, heaps = vocabulary
    growth, this = document-mass inequality).

    Cross-engine exactness: the classic rank formula
    G = 2·Σᵢ i·xᵢ / (n·Σx) − (n+1)/n is computed from the BOUNDED
    per-source length histogram — for a value v with count c starting
    at cumulative position p, Σ i·v over its run is
    v·(c·p + c·(c+1)/2), which depends only on the multiset, so ties
    need no order rule; gini_e6 = (2·S1·1e6) DIV (n·S0) −
    ((n+1)·1e6) DIV n with both DIVs truncating identically.  All
    BIGINT.  (S1 ≤ n²·max_len — fine to ~10^7 docs/source at e6
    scale; shard the histogram by length decile above that.)

    Scale shape: ONE corpus-scale hash agg (the bounded histogram);
    the positional sums are a window over sources × distinct lengths
    (metadata-scale); the corpus is never sorted or re-scanned."""
    hist = (
        _docs(spark, sf_dir)
        .select("source", F.col("n_chars").cast("long").alias("v"))
        .groupBy("source", "v")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    return _gini_from_hist(hist)


def _gini_from_hist(hist: DataFrame) -> DataFrame:
    """(source, v, c) histogram → (source, n, total_chars, gini_e6).
    Split from q_source_gini so the overflow test can drive it with
    adversarial (v, c) constants directly."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("source").orderBy("v")
    pos = hist.withColumn(
        "p",
        F.coalesce(
            F.sum("c").over(
                w.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ).cast("long"),
    )
    # S1 accumulates in DECIMAL(38,0) (degree_assortativity rule): at
    # 10^10 docs/source c·p ~ 1e20 and even the triangular number
    # c·(c+1)/2 ~ 5e19 exceed BIGINT, so every product is cast before
    # multiplying and the triangular term uses an exact parity split
    # (the even factor takes the halving BIGINT DIV, the product runs
    # in DECIMAL).  Values are identical at any scale BIGINT survives;
    # the DuckDB oracle's sums are HUGEINT natively.
    tri = (
        "CASE WHEN c % 2 = 0"
        " THEN CAST(c DIV 2 AS DECIMAL(38,0)) * (c + 1)"
        " ELSE CAST((c + 1) DIV 2 AS DECIMAL(38,0)) * c END"
    )
    sums = pos.groupBy("source").agg(
        F.sum(F.col("c")).cast("long").alias("n"),
        F.sum(F.col("v") * F.col("c")).cast("long").alias("s0"),
        F.sum(
            F.expr(
                "CAST(v AS DECIMAL(38,0))"
                f" * (CAST(c AS DECIMAL(38,0)) * p + ({tri}))"
            )
        )
        .cast("decimal(38,0)")
        .alias("s1"),
    )
    return sums.select(
        "source",
        "n",
        F.col("s0").alias("total_chars"),
        F.expr(
            "CAST((2 * s1 * 1000000) DIV (CAST(n AS DECIMAL(38,0)) * s0)"
            " - ((n + 1) * 1000000) DIV n AS BIGINT)"
        ).alias("gini_e6"),
    )


def _source_gini_sql() -> str:
    """source_gini oracle: identical bounded histogram, run-position
    sums, and the truncating-DIV Gini form."""
    return """
WITH hist AS (
  SELECT source, CAST(n_chars AS BIGINT) AS v,
         CAST(count(*) AS BIGINT) AS c
  FROM documents GROUP BY 1, 2
), pos AS (
  SELECT source, v, c,
         CAST(coalesce(sum(c) OVER (PARTITION BY source ORDER BY v
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS p
  FROM hist
), sums AS (
  SELECT source,
         CAST(sum(c) AS BIGINT) AS n,
         CAST(sum(v * c) AS BIGINT) AS s0,
         CAST(sum(v * (c * p + (c * (c + 1)) // 2)) AS BIGINT) AS s1
  FROM pos GROUP BY 1
)
SELECT source, n, s0 AS total_chars,
       CAST((2 * s1 * 1000000) // (n * s0)
            - ((n + 1) * 1000000) // n AS BIGINT) AS gini_e6
FROM sums
"""


# Robust-outlier MAD z cutoff (e3) — MIRRORED in the
# `quality_outliers` oracle SQL; change together.  3.5 MADs is the
# Iglewicz-Hoaglin screening line; z_e3 = ((2q−med2)·2000) DIV
# greatest(mad4, 1) is the doubled-median integer form (the
# rel_hourly_anomalies trick) on the exact e5 quality numerators.
OUT_Z_E3 = 3500


def robust_qe_stats(q: DataFrame, group: str) -> DataFrame:
    """Shared robust-statistics core (q_quality_outliers and the
    corpus-build job's --outlier-screen): from a (group, qe) frame,
    the bounded per-group histogram and the doubled-median recovery
    (cum-count crossing buckets) for BOTH the median (med2_e5) and
    the MAD (mad4_e5).  Returns bucket-level rows (group, qe, c,
    med2_e5, mad4_e5) — callers gate or aggregate from there.  One
    corpus-scale hash agg; everything after is metadata-scale."""
    from pyspark.sql.window import Window

    hist = q.groupBy(group, "qe").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    ws = Window.partitionBy(group)

    def med2_of(df: DataFrame, val: str, cnt: str) -> DataFrame:
        w = Window.partitionBy(group).orderBy(val)
        d = (
            df.withColumn("n", F.sum(cnt).over(ws).cast("long"))
            .withColumn(
                "cum",
                F.sum(cnt)
                .over(w.rowsBetween(Window.unboundedPreceding, 0))
                .cast("long"),
            )
            .withColumn("lo", F.expr("(n + 1) DIV 2"))
            .withColumn("hi", F.expr("(n + 2) DIV 2"))
        )
        hit = (
            (
                (F.col("cum") - F.col(cnt) < F.col("lo"))
                & (F.col("lo") <= F.col("cum"))
            ).cast("long")
            + (
                (F.col("cum") - F.col(cnt) < F.col("hi"))
                & (F.col("hi") <= F.col("cum"))
            ).cast("long")
        )
        return d.groupBy(group).agg(
            F.sum(F.col(val) * hit).cast("long").alias("m2"),
            F.max("n").cast("long").alias("n"),
        )

    med = med2_of(hist, "qe", "c").withColumnRenamed("m2", "med2_e5")
    dev = hist.join(
        F.broadcast(med.select(group, "med2_e5")), group
    ).select(
        group,
        F.abs(2 * F.col("qe") - F.col("med2_e5")).alias("dev2"),
        "c",
        "qe",
        "med2_e5",
    )
    devh = dev.groupBy(group, "dev2").agg(
        F.sum("c").cast("long").alias("c")
    )
    mad = (
        med2_of(devh, "dev2", "c")
        .withColumnRenamed("m2", "mad4_e5")
        .select(group, "mad4_e5")
    )
    return dev.join(F.broadcast(mad), group)


def q_quality_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source robust outlier screen on the quality score — the
    curation rule "drop documents statistically alien to their own
    source" (median/MAD so a source's junk cluster can't drag its own
    baseline, the rel_hourly_anomalies logic applied to curation):
    per source the exact doc-level median and MAD of quality, and the
    count of docs beyond ``OUT_Z_E3`` MADs.

    Cross-engine: quality is the exact e5 integer numerator
    (round5_stable); med2/mad4 use the doubled-median trick — but
    computed from the BOUNDED per-source histogram (cum-count
    crossing, the source_ks_drift shape), so the one-or-two middle
    DOC values are recovered without ever ranking data rows; the
    outlier gate is pure BIGINT.

    Scale shape: ONE corpus-scale hash agg (the bounded histogram);
    both median recoveries are windows over sources × ≤100001 bucket
    rows (metadata-scale); the outlier count is a bucket-level sum —
    the corpus is never sorted, never windowed, never re-scanned."""
    q = (
        _docs(spark, sf_dir)
        .select("source", quality_score().alias("quality"))
        .select(
            "source",
            F.expr(
                "CAST(floor(quality * 100000 + 0.5) AS BIGINT)"
            ).alias("qe"),
        )
    )
    dev = robust_qe_stats(q, "source")
    flagged = dev.withColumn(
        "is_out",
        (
            F.expr(
                "(abs(2 * qe - med2_e5) * 2000)"
                " DIV greatest(mad4_e5, 1L)"
            )
            >= OUT_Z_E3
        ).cast("long"),
    )
    return (
        flagged.groupBy("source")
        .agg(
            F.sum("c").cast("long").alias("n"),
            F.max("med2_e5").cast("long").alias("med2_e5"),
            F.max("mad4_e5").cast("long").alias("mad4_e5"),
            F.sum(F.col("c") * F.col("is_out"))
            .cast("long")
            .alias("n_outliers"),
        )
    )


def _quality_outliers_sql() -> str:
    """quality_outliers oracle: identical bounded-histogram doubled
    medians (cum-crossing buckets) and the BIGINT MAD z gate."""
    return _TEXT_CTE + f"""
, q0 AS (SELECT doc_id, {_QUALITY_SQL} AS quality FROM feats)
, q AS (
  SELECT d.source,
         CAST(floor(q0.quality * 100000 + 0.5) AS BIGINT) AS qe
  FROM q0 JOIN documents d ON q0.doc_id = d.doc_id
)
, hist AS (SELECT source, qe, CAST(count(*) AS BIGINT) AS c
           FROM q GROUP BY 1, 2)
, cum1 AS (
  SELECT source, qe, c,
         CAST(sum(c) OVER (PARTITION BY source) AS BIGINT) AS n,
         CAST(sum(c) OVER (PARTITION BY source ORDER BY qe
                           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
  FROM hist
)
, med AS (
  SELECT source, max(n) AS n,
         CAST(sum(qe * (CASE WHEN cum - c < (n + 1) // 2
                              AND (n + 1) // 2 <= cum THEN 1 ELSE 0 END
                        + CASE WHEN cum - c < (n + 2) // 2
                               AND (n + 2) // 2 <= cum THEN 1 ELSE 0 END))
              AS BIGINT) AS med2_e5
  FROM cum1 GROUP BY 1
)
, dev AS (
  SELECT h.source, abs(2 * h.qe - m.med2_e5) AS dev2, h.c,
         h.qe, m.med2_e5
  FROM hist h JOIN med m USING (source)
)
, devh AS (SELECT source, dev2, CAST(sum(c) AS BIGINT) AS c
           FROM dev GROUP BY 1, 2)
, cum2 AS (
  SELECT source, dev2, c,
         CAST(sum(c) OVER (PARTITION BY source) AS BIGINT) AS n,
         CAST(sum(c) OVER (PARTITION BY source ORDER BY dev2
                           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
  FROM devh
)
, mad AS (
  SELECT source,
         CAST(sum(dev2 * (CASE WHEN cum - c < (n + 1) // 2
                                AND (n + 1) // 2 <= cum THEN 1 ELSE 0 END
                          + CASE WHEN cum - c < (n + 2) // 2
                                 AND (n + 2) // 2 <= cum THEN 1 ELSE 0 END))
              AS BIGINT) AS mad4_e5
  FROM cum2 GROUP BY 1
)
SELECT d.source,
  CAST(sum(d.c) AS BIGINT) AS n,
  CAST(max(d.med2_e5) AS BIGINT) AS med2_e5,
  CAST(max(ma.mad4_e5) AS BIGINT) AS mad4_e5,
  CAST(sum(d.c * (CASE WHEN (abs(2 * d.qe - d.med2_e5) * 2000)
                        // greatest(ma.mad4_e5, 1) >= {OUT_Z_E3}
                  THEN 1 ELSE 0 END)) AS BIGINT) AS n_outliers
FROM dev d JOIN mad ma USING (source)
GROUP BY 1
"""


# PSI share scale (e9) — MIRRORED in the `psi_drift` oracle SQL;
# change together.  Shares are +1-smoothed (the doremi convention) and
# clamped ≥ 1 so ln never sees 0 at any corpus size; slices are the
# knuth parity halves.
PSI_SHARE_SCALE = 1_000_000_000


def q_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population-stability-index drift monitor — the OTHER standard
    drift alarm next to `source_ks_drift`'s KS distance (PSI is what
    credit/ads/quality dashboards actually page on; KS reads the max
    CDF gap, PSI weights every bucket's share shift by its log-ratio):
    per source, PSI between two deterministic halves of the corpus
    (knuth-parity slices — a self-drift baseline that should sit near
    0; swap one slice for "yesterday's snapshot" in production) over
    the bounded quality histogram.

    Cross-engine: buckets via `quality_bucket()` (exact-integer);
    smoothed shares s = greatest(((c+1)·1e9) DIV (n + n_buckets), 1)
    are BIGINTs (the +1 smoothing and the ≥1 clamp keep ln finite at
    ANY corpus size); per-bucket term = (s_a − s_b) ·
    floor(ln(s_a/s_b)·1e3) — the e3-floored-log discipline on the
    ratio of two exact integers; psi_e12 = Σ terms, all BIGINT.

    Scale shape: ONE corpus-scale hash agg (the bounded per-source
    histogram with conditional slice counters — the source_ks_drift
    shape, one pass for both slices); totals broadcast back; terms
    and the per-source sum are metadata-scale."""
    scored = _docs(spark, sf_dir).select(
        "doc_id", "source", quality_score().alias("quality")
    )
    base = scored.select(
        "source",
        quality_bucket().alias("qb"),
        (knuth_hash(F.col("doc_id")) % 2).alias("sl"),
    )
    cnts = base.groupBy("source", "qb").agg(
        F.sum(F.when(F.col("sl") == 0, 1).otherwise(0))
        .cast("long")
        .alias("c_a"),
        F.sum(F.when(F.col("sl") == 1, 1).otherwise(0))
        .cast("long")
        .alias("c_b"),
    )
    tot = cnts.groupBy("source").agg(
        F.sum("c_a").cast("long").alias("n_a"),
        F.sum("c_b").cast("long").alias("n_b"),
        F.count(F.lit(1)).cast("long").alias("n_buckets"),
    )
    j = (
        cnts.join(F.broadcast(tot), "source")
        .withColumn(
            "s_a",
            F.expr(
                f"greatest(((c_a + 1) * {PSI_SHARE_SCALE})"
                " DIV (n_a + n_buckets), 1)"
            ).cast("long"),
        )
        .withColumn(
            "s_b",
            F.expr(
                f"greatest(((c_b + 1) * {PSI_SHARE_SCALE})"
                " DIV (n_b + n_buckets), 1)"
            ).cast("long"),
        )
        .withColumn(
            "term",
            (
                (F.col("s_a") - F.col("s_b"))
                * F.expr(
                    "CAST(floor(ln(CAST(s_a AS DOUBLE)"
                    " / CAST(s_b AS DOUBLE)) * 1000) AS BIGINT)"
                )
            ).cast("long"),
        )
    )
    return j.groupBy("source").agg(
        F.max("n_a").cast("long").alias("n_a"),
        F.max("n_b").cast("long").alias("n_b"),
        F.max("n_buckets").cast("long").alias("n_buckets"),
        F.sum("term").cast("long").alias("psi_e12"),
    )


def q_source_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift monitor between sources: the two-sample
    Kolmogorov-Smirnov distance on the quality-score distribution for
    every source pair — the standard data-quality alarm a production
    pipeline runs when a crawl snapshot, scraper version, or upstream
    source changes (a large KS between the old and new distribution
    of the SAME source gates the ingest).

    Computed on the bounded quality histogram (`quality_bucket`, the
    proven exact-integer bucketing): per-source bucket counts → dense
    (source × observed-buckets) grid → cumulative counts → e9-scaled
    BIGINT CDFs cdf = (cum*1e9) DIV n → ks_e9 = max |cdf_a - cdf_b|
    per pair.  Everything past the quality score is BIGINT, and the
    e9 CDF keeps every operand < 2^63 at ANY corpus size (cum*n_b
    cross-products would overflow at 10^10 rows/source).

    Scale shape: ONE corpus-scale hash agg (the bounded histogram —
    sources × ≤1001 rows, the quality_gate_thresholds trick); the
    grid/CDF/pair stages are metadata-scale (the bucket set is
    broadcast), so all-pairs over sources is sources²×buckets tiny
    rows, never a corpus join."""
    pairs, _bks = _quality_cdf_pairs(spark, sf_dir)
    return pairs.groupBy("source_a", "source_b").agg(
        F.max("n_a").cast("long").alias("n_a"),
        F.max("n_b").cast("long").alias("n_b"),
        F.max(F.abs(F.col("cdf_a") - F.col("cdf_b")))
        .cast("long")
        .alias("ks_e9"),
    )


def _quality_cdf_pairs(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    """The shared source-pair quality-CDF chain of `source_ks_drift`
    and `source_w1_drift` (edit once, both oracles move): bounded
    quality histogram → dense source×bucket grid → e9 integer CDFs →
    all source pairs aligned on qb.  Returns (pairs, bks) — bks is
    the distinct observed-bucket table the W1 gap rule needs."""
    from pyspark.sql.window import Window

    scored = _docs(spark, sf_dir).select(
        "doc_id", "source", quality_score().alias("quality")
    )
    hist = scored.groupBy("source", quality_bucket().alias("qb")).agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    tot = hist.groupBy("source").agg(F.sum("c").cast("long").alias("n"))
    bks = hist.select("qb").distinct()
    grid = tot.crossJoin(F.broadcast(bks))  # bounded: sources × ≤1001
    cum = (
        grid.join(hist, ["source", "qb"], "left")
        .select(
            "source",
            "n",
            "qb",
            F.coalesce("c", F.lit(0).cast("long")).alias("c0"),
        )
        .withColumn(
            "cum",
            F.sum("c0")
            .over(Window.partitionBy("source").orderBy("qb"))
            .cast("long"),
        )
    )
    cdf = cum.select(
        "source", "n", "qb", F.expr("(cum * 1000000000) DIV n").alias("cdf")
    )
    a = cdf.select(
        F.col("source").alias("source_a"),
        F.col("n").alias("n_a"),
        "qb",
        F.col("cdf").alias("cdf_a"),
    )
    b = cdf.select(
        F.col("source").alias("source_b"),
        F.col("n").alias("n_b"),
        "qb",
        F.col("cdf").alias("cdf_b"),
    )
    pairs = a.join(b, "qb").where(F.col("source_a") < F.col("source_b"))
    return pairs, bks


def q_source_w1_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wasserstein-1 (earth-mover) drift between sources on the
    quality distribution — the MAGNITUDE-weighted complement of
    `source_ks_drift`'s KS (max gap, location-blind) and `psi_drift`'s
    PSI (share-ratio, bin-local): W1 integrates |F_a − F_b| over the
    score axis, so it reads HOW FAR probability mass moved, the
    number a curation team compares against an ingest tolerance in
    score units.

    Exact integer form on the shared bounded CDF chain: the CDFs are
    constant between consecutive observed buckets, so
    W1 = Σ_i |cdf_a(qb_i) − cdf_b(qb_i)| · (qb_{i+1} − qb_i) over the
    sorted distinct buckets (the last bucket spans zero width and is
    excluded on both engines via the lead-NULL rule).  Units: e9 CDF ×
    e3-scale quality bucket → w1_e9b < 1e15 at ANY corpus size — all
    BIGINT.

    Scale shape: identical to `source_ks_drift` — ONE corpus-scale
    hash agg, then metadata-scale grid/CDF/pair stages; the gap table
    is one lead() over the ≤1001-row bucket set."""
    from pyspark.sql.window import Window

    pairs, bks = _quality_cdf_pairs(spark, sf_dir)
    nxt = bks.select(
        "qb",
        F.lead("qb").over(Window.orderBy("qb")).alias("qb_next"),
    ).where(F.col("qb_next").isNotNull())
    return (
        pairs.join(nxt, "qb")
        .groupBy("source_a", "source_b")
        .agg(
            F.max("n_a").cast("long").alias("n_a"),
            F.max("n_b").cast("long").alias("n_b"),
            F.sum(
                F.abs(F.col("cdf_a") - F.col("cdf_b"))
                * (F.col("qb_next") - F.col("qb"))
            )
            .cast("long")
            .alias("w1_e9b"),
        )
    )


def q_stratified_sample(
    spark: SparkSession, sf_dir: str, k: int = 20
) -> DataFrame:
    """Per-stratum fixed-quota sampling — exactly k docs per language,
    chosen by Knuth-hash rank (deterministic, partitioning-independent)
    — completing the sampling family: `mixture_sample` = rate-based,
    `corpus_sample` = global quota, this = per-stratum quota.  Scale
    shape: ONE exchange (the per-lang window); languages are few and
    fat, so at 100 TB the same query runs as a per-partition top-k +
    merge (rank<=k never needs the full sort spilled).  Emits
    (lang, doc_id, rk) so the exact membership AND order are
    value-checked."""
    from pyspark.sql.window import Window

    h = knuth_hash(F.col("doc_id"))
    w = Window.partitionBy("lang").orderBy(h, "doc_id")
    return (
        _docs(spark, sf_dir)
        .select("lang", "doc_id", F.row_number().over(w).alias("rk"))
        .where(F.col("rk") <= k)
        .select("lang", "doc_id", F.col("rk").cast("long").alias("rk"))
    )


def q_corpus_sample(spark: SparkSession, sf_dir: str, k: int = 100) -> DataFrame:
    """Deterministic uniform inspection sample: the k docs with the
    lowest Knuth-hash value — the distributed answer to reservoir
    sampling.  Scale shape: Spark plans orderBy+limit as
    TakeOrderedAndProject (per-partition top-k, driver merge of k·P
    candidates) — NO full sort, no corpus shuffle, identical sample on
    any partitioning or cluster size.  Emits md5(text) so the sampled
    content is value-checked without shipping it."""
    h = knuth_hash(F.col("doc_id"))
    return (
        _docs(spark, sf_dir)
        .select(
            "doc_id", "lang", h.alias("h"), F.md5("text").alias("text_md5")
        )
        .orderBy("h", "doc_id")
        .limit(k)
    )


def q_corpus_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-run corpus diff — the incremental-crawl question "what
    changed since the last snapshot": full-outer join of two corpus
    versions on doc_id comparing content md5, classified
    added / removed / changed / unchanged.  The 'previous' snapshot is
    derived deterministically from the same table (doc_id%7==0 docs
    are new this run; doc_id%11==0 docs changed text; doc_id%13==5
    docs were dropped) and mirrored in SQL, so all four classes are
    populated and value-checked.  Scale shape: ONE shuffle join on the
    primary key — at 100 TB both snapshots are bucketed by doc_id so
    the join is co-located and shuffle-free; content compare is on
    md5, never the text bytes."""
    docs = _docs(spark, sf_dir).select("doc_id", "text")
    prev = docs.where(F.col("doc_id") % 7 != 0).select(
        "doc_id",
        F.md5(
            F.when(
                F.col("doc_id") % 11 == 0, F.concat("text", F.lit(" v1"))
            ).otherwise(F.col("text"))
        ).alias("h_prev"),
    )
    new = docs.where(F.col("doc_id") % 13 != 5).select(
        "doc_id", F.md5("text").alias("h_new")
    )
    status = (
        F.when(F.col("h_prev").isNull(), "added")
        .when(F.col("h_new").isNull(), "removed")
        .when(F.col("h_prev") != F.col("h_new"), "changed")
        .otherwise("unchanged")
    )
    return (
        prev.join(new, "doc_id", "full_outer")
        .select(status.alias("status"))
        .groupBy("status")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


def q_lm_score(spark: SparkSession, sf_dir: str, vocab_k: int = 30) -> DataFrame:
    """Unigram-LM fluency scoring (the KenLM-filter stand-in): average
    log-probability of a doc's tokens under the corpus's own top-K
    unigram distribution, plus the out-of-vocabulary count.  Scale
    shape: ONE corpus pass for the vocab counts (hash agg), the vocab
    ships back as a LITERAL map expression (the centroid-literal
    pattern — metadata-scale, zero join), and scoring is a pure
    per-row fold — the token stream is never exploded into a shuffle.
    Cross-engine care: p = cnt/total is the identical rational double
    on both sides; Spark scores against Python math.log literals while
    the oracle evaluates ln() in DuckDB (both glibc here, but only
    1-ulp-close in general) and sums in its own order, so the per-doc
    average is rounded to 3 dp to absorb both drifts (was 4 dp; reduced
    when the drift proved >1e-4 on long token streams), via the
    STABLE floor form — engine round() disagrees on exact halves
    (CLAUDE.md per-row-scalar discipline).  vocab_k defaults small
    (30) so the synthetic corpus exercises the OOV path; production
    runs pass 10^5+ — the literal map stays metadata-scale either
    way."""
    docs = _docs(spark, sf_dir).select("doc_id", "text")
    vocab = _lm_vocab(docs, vocab_k)
    toks = _lm_tokens()
    lp_map = F.create_map(
        *[F.lit(x) for kv in vocab.items() for x in kv]
    )
    lp = F.transform(toks, lambda t: lp_map[t])
    in_vocab = F.filter(lp, lambda x: x.isNotNull())
    n_in = F.size(in_vocab)
    avg_lp = F.aggregate(
        in_vocab, F.lit(0.0), lambda a, x: a + x
    ) / n_in.cast("double")
    return docs.where(F.trim("text") != "").select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        (F.size(toks) - n_in).cast("long").alias("n_oov"),
        F.when(n_in > 0, round3_stable(avg_lp)).alias("avg_logprob"),
    )


def _lm_tokens() -> F.Column:
    """The shared token-array expression (JVM-side so the broadcast
    path scores the IDENTICAL tokens — Python lower()/split() differ
    from Spark's on unicode edge cases)."""
    return F.split(F.trim(F.lower(F.col("text"))), "[ \\t\\n\\x0B\\f\\r]+")


def _lm_vocab(docs: DataFrame, vocab_k: int) -> dict[str, float]:
    """One corpus pass → top-K unigram log-probs (driver-side dict)."""
    import math

    counts = (
        docs.where(F.trim("text") != "")
        .select(F.explode(_lm_tokens()).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), "tok")
        .limit(vocab_k)
        .collect()
    )
    total = sum(r["cnt"] for r in counts)
    return {r["tok"]: math.log(r["cnt"] / total) for r in counts}


def q_lm_score_broadcast(
    spark: SparkSession, sf_dir: str, vocab_k: int = 30
) -> DataFrame:
    """`lm_score` with the vocab shipped as a Spark BROADCAST VARIABLE
    scored inside an Arrow-batched pandas UDF — the shape that survives
    production vocab sizes (10^5+ entries): the literal create_map path
    inflates every serialized plan and task by the whole vocab, while a
    broadcast variable ships once per executor and the plan stays
    bounded.  Tokenization stays JVM-side (the same expression as the
    literal path) so both paths score identical tokens; the UDF folds
    log-probs in token order with the same IEEE adds, so outputs are
    bit-identical to the literal path (pytest-locked at vocab_k=10^4)
    and the DuckDB oracle is shared verbatim with `lm_score`."""
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    bv = spark.sparkContext.broadcast(_lm_vocab(docs, vocab_k))

    out_t = StructType(
        [
            StructField("n_in", LongType()),
            StructField("sum_lp", DoubleType()),
        ]
    )

    # Scoring deliberately stays a token-order Python loop inside the
    # Arrow batch: the candidate vectorization (flatten → Series.map →
    # np.add.reduceat per doc) is NOT bit-identical to the JVM literal
    # path — reduceat sums pairwise, the fold sums sequentially, and
    # they diverge by ~1e-12 on ~600-token docs (measured), which the
    # bit-identity pytest vs `lm_score` would rightly fail.  The loop
    # is dict-lookup-bound and plan-locked to ONE UDF evaluation.
    @F.pandas_udf(out_t)
    def score(tok_arrays: pd.Series) -> pd.DataFrame:
        vocab = bv.value
        n_in = []
        sums = []
        for toks in tok_arrays:
            s = 0.0
            n = 0
            for t in toks:
                lp = vocab.get(t)
                if lp is not None:
                    s += lp
                    n += 1
            n_in.append(n)
            sums.append(s)
        return pd.DataFrame({"n_in": n_in, "sum_lp": sums})

    toks = _lm_tokens()
    scored = docs.where(F.trim("text") != "").select(
        "doc_id", F.size(toks).alias("n_toks"), score(toks).alias("s")
    )
    n_in = F.col("s.n_in")
    return scored.select(
        "doc_id",
        F.col("n_toks").cast("long").alias("n_tokens"),
        (F.col("n_toks") - n_in).cast("long").alias("n_oov"),
        F.when(
            n_in > 0, round3_stable(F.col("s.sum_lp") / n_in.cast("double"))
        ).alias("avg_logprob"),
    )


def q_ccnet_buckets(
    spark: SparkSession, sf_dir: str, vocab_k: int = 30
) -> DataFrame:
    """CCNet-style per-language perplexity bucketing (Wenzek et al.
    2020, "CCNet: Extracting High Quality Monolingual Datasets from
    Web Crawl Data" §4.4): within each language, split scoreable docs
    into head / middle / tail terciles by LM score (best scores =
    head — the slices CCNet trains on / drops).  The LM is the corpus
    unigram model the green `lm_score` oracle already proves; the
    per-doc score is the e3-floored BIGINT ``lp_e3`` so every bucket
    comparison is exact-integer cross-engine (no float thresholds
    anywhere).

    Tercile rule (deterministic under ties): with n scoreable docs in
    a language and cum(v) = #docs with lp_e3 >= v, the head cut is
    t1 = max{v : cum(v) >= (n+2) DIV 3} and the middle cut is
    t2 = max{v : cum(v) >= (2n+2) DIV 3}; head := lp_e3 >= t1,
    middle := t2 <= lp_e3 < t1, tail := lp_e3 < t2.  Ties share a
    bucket (head may exceed n/3) — the same value can never straddle a
    boundary, so the assignment is stable under any row order.

    Scale shape: the `quality_quantile_gate_approx` two-pass pattern
    made EXACT — per-doc scoring is a zero-exchange literal-map fold;
    pass 1 is ONE bounded (lang, lp_e3) hash agg (lp_e3 is an integer
    with corpus-bounded range, so the agg output is metadata-scale
    like the 1001-bucket quality histogram); thresholds come from a
    window over that tiny agg and join back via ONE broadcast join;
    the bucket assign is a pure map.  No per-lang sort of the corpus,
    no global window."""
    from pyspark.sql.window import Window

    docs = _docs(spark, sf_dir).select("doc_id", "lang", "text")
    vocab = _lm_vocab(docs.select("doc_id", "text"), vocab_k)
    toks = _lm_tokens()
    lp_map = F.create_map(*[F.lit(x) for kv in vocab.items() for x in kv])
    in_vocab = F.filter(
        F.transform(toks, lambda t: lp_map[t]), lambda x: x.isNotNull()
    )
    n_in = F.size(in_vocab)
    lp_e3 = F.floor(
        F.aggregate(in_vocab, F.lit(0.0), lambda a, x: a + x)
        / n_in.cast("double")
        * 1000.0
        + F.lit(0.5)
    ).cast("long")
    scored = (
        docs.where(F.trim("text") != "")
        .select("doc_id", "lang", n_in.alias("n_in"), lp_e3.alias("lp_e3"))
        .where(F.col("n_in") > 0)
        .drop("n_in")
    )

    hist = scored.groupBy("lang", "lp_e3").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    wcum = (
        Window.partitionBy("lang")
        .orderBy(F.col("lp_e3").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = hist.select(
        "lang",
        "lp_e3",
        F.sum("cnt").over(wcum).alias("cum"),
        F.sum("cnt").over(Window.partitionBy("lang")).alias("n"),
    )
    cuts = cum.groupBy("lang").agg(
        F.max(
            F.when(F.col("cum") >= F.expr("(n + 2) DIV 3"), F.col("lp_e3"))
        ).alias("t1"),
        F.max(
            F.when(
                F.col("cum") >= F.expr("(2 * n + 2) DIV 3"), F.col("lp_e3")
            )
        ).alias("t2"),
    )
    return scored.join(F.broadcast(cuts), "lang").select(
        "doc_id",
        "lang",
        "lp_e3",
        F.when(F.col("lp_e3") >= F.col("t1"), F.lit("head"))
        .when(F.col("lp_e3") >= F.col("t2"), F.lit("middle"))
        .otherwise(F.lit("tail"))
        .alias("bucket"),
    )


# Unicode-NFC injection suffix (DECOMPOSED e/i + combining mark
# U+0301/U+0308, never the precomposed codepoint) — MIRRORED in the
# `unicode_nfc` oracle SQL via chr(769)/chr(776); change together.
NFC_SUFFIX = " cafe\u0301 nai\u0308ve"


def q_unicode_nfc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode NFC normalization audit — the canonicalization step a
    web-text pipeline runs before hashing/dedup (decomposed and
    precomposed accents must collide: 'cafe'+U+0301 vs 'café' are
    different byte strings for the same text, so every downstream
    exact-dedup hash silently misses them without this).  Docs with
    doc_id % 7 == 2 get a deterministic DECOMPOSED suffix injected so
    the corpus genuinely exercises recomposition; output is per doc:
    char lengths before/after, changed flag, and the md5 of the NFC
    text (proving the full normalized string, not just its length).

    Cross-engine: Spark normalizes via Python's unicodedata.normalize
    ('NFC') in ONE Arrow-batched pandas UDF; DuckDB via its native
    nfc_normalize() — both implement the same Unicode standard and the
    md5s match exactly (verified including combining-mark inputs).
    The UDF is marked nondeterministic so Catalyst plans it ONCE (the
    parse-UDF invariant); derived columns read the materialized
    column, never re-invoke the UDF.

    Scale shape: pure per-row map, zero exchanges, one UDF pass."""
    from pyspark.sql.types import StringType

    @F.pandas_udf(StringType())
    def to_nfc(s: pd.Series) -> pd.Series:
        import unicodedata

        return s.map(lambda x: unicodedata.normalize("NFC", x))

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    raw = F.when(
        F.col("doc_id") % 7 == 2, F.concat("text", F.lit(NFC_SUFFIX))
    ).otherwise(F.col("text"))
    staged = docs.select("doc_id", raw.alias("raw")).select(
        "doc_id", "raw", to_nfc.asNondeterministic()(F.col("raw")).alias("nfc")
    )
    return staged.select(
        "doc_id",
        F.length("raw").cast("long").alias("n_chars_raw"),
        F.length("nfc").cast("long").alias("n_chars_nfc"),
        (F.md5("raw") != F.md5("nfc")).cast("long").alias("changed"),
        F.md5("nfc").alias("nfc_md5"),
    )


# Inverted-index vocab size — MIRRORED in the oracle SQL.
IDX_TOPK = 40


def q_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional inverted-index build for the corpus's top
    ``IDX_TOPK`` terms — the persisted artifact behind the BM25 /
    TF-IDF retrieval family (those queries score with driver-literal
    stats; this materializes the postings a search service would
    actually serve).  One row per (term, doc) posting: tf and the
    first/last 0-based token positions (position extraction proven,
    not just counts).

    Scale shape: vocab is one corpus token-count pass shipped back as
    a driver literal IN-list (the lm_score pattern); postings are
    posexplode → literal-IN filter → ONE (term, doc_id) hash agg —
    the composite key keeps hot terms spread across docs, so no
    single-term hotspot; no per-term collect_list (a top term's
    posting list is corpus-sized at 100 TB — it must stay rows, never
    an in-memory array)."""
    docs = (
        _docs(spark, sf_dir)
        .select("doc_id", "text")
        .where(F.trim("text") != "")
    )
    toks = _lm_tokens()
    top = [
        r["tok"]
        for r in docs.select(F.explode(toks).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), "tok")
        .limit(IDX_TOPK)
        .collect()
    ]
    ex = docs.select("doc_id", F.posexplode(toks).alias("pos", "term"))
    return (
        ex.where(F.col("term").isin(top))
        .groupBy("term", "doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("tf"),
            F.min("pos").cast("long").alias("first_pos"),
            F.max("pos").cast("long").alias("last_pos"),
        )
    )


# Bloom-filter sizing (bit-array size, hash count, double-hashing
# offset) — MIRRORED in the `bloom_dedup` oracle SQL; change together.
# M is deliberately small enough that the filter saturates at sf0.1
# (~94% false positives) while staying informative at sf0.01 (~4%):
# the query is the sizing audit a Dolma-style Bloom dedup needs BEFORE
# committing to an M at corpus scale.
BLOOM_M_BITS = 4096
BLOOM_K = 3
BLOOM_H2_OFFSET = 777


def q_bloom_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter dedup audit — the memory-bounded exact-dedup
    alternative web-scale pipelines (Dolma's deduper) run when the
    md5-per-doc state itself is too big: a doc is flagged duplicate
    when ALL ``BLOOM_K`` of its bit positions were already set.  This
    query simulates the filter deterministically over the injected-dup
    corpus and classifies every doc against ground-truth exact dedup:
    ``dup`` (correctly caught), ``false_positive`` (flagged unique —
    the Bloom trade-off, REAL data loss in a dedup pipeline),
    ``unique``, and the structurally-impossible ``missed`` branch
    (Bloom has no false negatives — pytest asserts its count is 0).

    Determinism: the sequential "was set by an EARLIER insert" race is
    resolved by doc_id order — position p is set-before-doc-d iff
    min(doc_id) over p's setters < d — which makes the parallel
    formulation order-free and exactly mirrorable in SQL.

    Cross-engine: key = first 13 hex chars of md5(text) as a 52-bit
    int (Spark conv(_,16,10) == DuckDB '0x'||_ cast); positions are
    classic double hashing (h1 + j*h2) % M with both h's from
    ``knuth_hash`` — all BIGINT, zero floats.

    Scale shape: the position table is K rows/doc, its first-setter
    agg is bounded by M (broadcast back — at corpus scale M is sized
    to the corpus and this becomes the standard bucket-join); exact
    ground truth is one window over the key shuffle.  No UDF, no
    collect, no sequential pass."""
    from pyspark.sql.window import Window

    docs = with_injected_dups(_docs(spark, sf_dir)).select("doc_id", "text")
    key = F.conv(F.substring(F.md5("text"), 1, 13), 16, 10).cast("long")
    keyed = docs.select("doc_id", key.alias("k"))
    h1 = knuth_hash(F.col("k"))
    h2 = knuth_hash(F.col("k") + F.lit(BLOOM_H2_OFFSET))
    pos = F.array(
        *[(h1 + F.lit(j) * h2) % F.lit(BLOOM_M_BITS) for j in range(BLOOM_K)]
    )
    px = keyed.select("doc_id", F.explode(pos).alias("pos"))
    first_set = px.groupBy("pos").agg(F.min("doc_id").alias("first_setter"))
    flagged = (
        px.join(F.broadcast(first_set), "pos")
        .groupBy("doc_id")
        .agg(
            F.min(
                (F.col("first_setter") < F.col("doc_id")).cast("long")
            ).alias("bloom_dup")
        )
    )
    wk = Window.partitionBy("k")
    exact = keyed.select(
        "doc_id",
        (F.min("doc_id").over(wk) < F.col("doc_id"))
        .cast("long")
        .alias("exact_dup"),
    )
    return exact.join(flagged, "doc_id").select(
        "doc_id",
        "exact_dup",
        "bloom_dup",
        F.when(
            (F.col("exact_dup") == 1) & (F.col("bloom_dup") == 1), F.lit("dup")
        )
        .when(F.col("bloom_dup") == 1, F.lit("false_positive"))
        .when(F.col("exact_dup") == 1, F.lit("missed"))
        .otherwise(F.lit("unique"))
        .alias("verdict"),
    )


# Synthetic-URL component moduli + the variant/tracking-param injection
# pattern — MIRRORED in the `url_canonicalize` oracle SQL's raw-URL CTE;
# change together.  Moduli chosen so canonical groups collide from
# sf0.01 up (lcm(5,7,11)=385 < 500 docs).
URL_HOST_MOD = 5
URL_PATH_MOD = 7
URL_ID_MOD = 11


def q_url_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization + canonical-URL dedup — the crawl-frontier
    and post-crawl dedup step every web-text pipeline runs before
    content dedup (the same page arrives as http-vs-HTTPS, with/without
    :443, with tracking params in shuffled order, trailing slashes and
    fragments — byte-level URL dedup misses all of it).  Each doc gets
    a deterministic raw URL with injected variants (case, default
    port, trailing slash, utm_*/param order, fragment); the query
    canonicalizes the RAW STRING via real string/array ops — lowercase
    scheme+host, strip default port, strip fragment, drop
    utm_*/fbclid/gclid params, sort surviving params, collapse
    trailing slashes — then groups by canonical URL (group size +
    min-doc_id keeper flag).

    Cross-engine: split/element_at/filter/array_sort/concat_ws map 1:1
    to DuckDB string_split/[i]/list_filter/list_sort/array_to_string;
    the one regex (':443$' / '/+$') is anchored and
    Java-regex==RE2-safe (no \\s — CLAUDE.md discipline).

    Scale shape: canonicalization is a pure per-row map (no UDF — all
    JVM string ops); grouping is ONE window over the canonical-url
    shuffle, the standard exact-dedup-by-key exchange."""
    from pyspark.sql.window import Window

    d = F.col("doc_id")
    s = lambda c: c.cast("string")  # noqa: E731
    host = F.concat(
        F.lit("www.example"), s(d % URL_HOST_MOD), F.lit(".com")
    )
    raw = F.concat(
        F.when(d % 3 == 0, F.lit("HTTPS")).otherwise(F.lit("https")),
        F.lit("://"),
        F.when(d % 3 == 0, F.upper(host)).otherwise(host),
        F.when(d % 5 == 0, F.lit(":443")).otherwise(F.lit("")),
        F.lit("/articles/"),
        s(d % URL_PATH_MOD),
        F.when(d % 4 == 0, F.lit("/")).otherwise(F.lit("")),
        F.lit("?"),
        F.when(
            d % 2 == 0,
            F.concat(
                F.lit("utm_source=feed&id="), s(d % URL_ID_MOD), F.lit("&ref=rss")
            ),
        ).otherwise(
            F.concat(
                F.lit("ref=rss&id="), s(d % URL_ID_MOD), F.lit("&utm_campaign=x")
            )
        ),
        F.when(d % 6 == 0, F.lit("#section-2")).otherwise(F.lit("")),
    )
    staged = _docs(spark, sf_dir).select("doc_id", raw.alias("raw_url"))

    nofrag = F.substring_index("raw_url", "#", 1)
    base = F.substring_index(nofrag, "?", 1)
    query = F.when(
        nofrag.contains("?"), F.substring_index(nofrag, "?", -1)
    ).otherwise(F.lit(""))
    parts = F.split(base, "/")
    scheme = F.lower(F.element_at(parts, 1))
    hostp = F.regexp_replace(F.lower(F.element_at(parts, 3)), ":443$", "")
    path0 = F.regexp_replace(
        F.concat(F.lit("/"), F.concat_ws("/", F.slice(parts, 4, F.size(parts) - 3))),
        "/+$",
        "",
    )
    cpath = F.when(path0 == "", F.lit("/")).otherwise(path0)
    keep = F.filter(
        F.split(query, "&"),
        lambda p: (~p.startswith("utm_"))
        & (~p.startswith("fbclid="))
        & (~p.startswith("gclid="))
        & (p != ""),
    )
    qs = F.concat_ws("&", F.array_sort(keep))
    canon = F.concat(
        scheme,
        F.lit("//"),
        hostp,
        cpath,
        F.when(qs == "", F.lit("")).otherwise(F.concat(F.lit("?"), qs)),
    )
    wc = Window.partitionBy("canon_url")
    return staged.select("doc_id", "raw_url", canon.alias("canon_url")).select(
        "doc_id",
        "raw_url",
        "canon_url",
        F.count(F.lit(1)).over(wc).cast("long").alias("n_variants"),
        (F.min("doc_id").over(wc) == F.col("doc_id"))
        .cast("long")
        .alias("is_keeper"),
    )


# BM25 constants (Robertson/Spärck Jones defaults) — baked into BOTH
# the Spark expression and the SQL oracle; change together.
BM25_K1 = 1.2
BM25_B = 0.75
BM25_N_TERMS = 3
BM25_TOPK = 20


def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 text-retrieval top-k — the lexical member of the
    similarity-search family (ANN covers embeddings; this covers the
    sparse/keyword side a RAG or search pipeline needs).  Query terms
    are the corpus's top-``BM25_N_TERMS`` tokens by (count desc, tok)
    so the whole query is deterministic and oracle-mirrorable.

    Scale shape: ONE token-count pass picks the terms (hash agg +
    tiny top-k), one bounded agg computes df per term and (N, avgdl) —
    all metadata-scale driver literals, the lm_score vocab pattern.
    Scoring is a pure per-row fold (tf per term via
    size(filter(tokens)), no explode, no UDF, 0 exchanges) ending in a
    TakeOrderedAndProject of ``BM25_TOPK`` rows.

    Cross-engine exactness: idf = ln((N - df + 0.5)/(df + 0.5) + 1) is
    a Python math.log literal vs DuckDB ln() of the identical rational
    (the dsir precedent); tf and dl are exact integers; the three
    per-term scores are added in FIXED term order on both engines; the
    score ships as the stable-rounded integer numerator
    floor(score*1e3 + 0.5)."""
    import math

    docs = _docs(spark, sf_dir).select("doc_id", "text").where(
        F.trim("text") != ""
    )
    toks = _lm_tokens()

    term_rows = (
        docs.select(F.explode(toks).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.col("c").desc(), "tok")
        .limit(BM25_N_TERMS)
        .collect()
    )
    terms = [r["tok"] for r in term_rows]

    wd = docs.select(F.size(toks).alias("dl"), toks.alias("t"))
    stats = wd.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("dl").alias("total"),
        *[
            F.sum(F.array_contains("t", t).cast("long")).alias(f"df{i}")
            for i, t in enumerate(terms)
        ],
    ).collect()[0]
    n_docs = int(stats["n"])
    avgdl = int(stats["total"]) / n_docs
    idfs = [
        math.log((n_docs - int(stats[f"df{i}"]) + 0.5)
                 / (int(stats[f"df{i}"]) + 0.5) + 1.0)
        for i in range(len(terms))
    ]

    dlr = F.size(toks).cast("double") / F.lit(avgdl)

    def term_score(term: str, idf: float) -> F.Column:
        tf = F.size(
            F.filter(toks, lambda x: x == F.lit(term))
        ).cast("double")
        den = tf + F.lit(BM25_K1) * (
            F.lit(1.0 - BM25_B) + F.lit(BM25_B) * dlr
        )
        return F.lit(idf) * ((tf * F.lit(BM25_K1 + 1.0)) / den)

    score = term_score(terms[0], idfs[0])
    for t, i in zip(terms[1:], idfs[1:]):
        score = score + term_score(t, i)
    from pyspark.sql.window import Window

    bm25_e3 = F.floor(score * F.lit(1000.0) + F.lit(0.5)).cast("long")
    return (
        docs.select("doc_id", bm25_e3.alias("bm25_e3"))
        .orderBy(F.col("bm25_e3").desc(), "doc_id")
        .limit(BM25_TOPK)
        .select(
            "doc_id",
            "bm25_e3",
            F.row_number()
            .over(
                Window.orderBy(F.col("bm25_e3").desc(), "doc_id")
            )
            .cast("long")
            .alias("rank"),
        )
    )


# Query-likelihood spec — MIRRORED in `_qlm_sql`; change together.
# Dirichlet prior μ = QLM_MU; the query is the bm25 term set (the
# same (cnt DESC, tok) top-BM25_N_TERMS ranking), so bm25/QLM/dense
# rank the SAME query three ways.
QLM_MU = 2000


def q_qlm_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dirichlet-smoothed query-likelihood retrieval (Ponte & Croft
    1998; Zhai & Lafferty 2001 §Dirichlet) — the probabilistic
    language-model ranker that completes the retrieval trio (bm25 =
    tf-idf family, rrf's dense leg = vectors, this = LM): score(d) =
    Σ_q ln p(t|θ_d) with p = (tf + μ·p(t|C))/(dl + μ), over the SAME
    deterministic query `bm25_topk` uses.

    Cross-engine: each term's smoothed probability reduces to the
    integer rational (tf·N + μ·cf) / (N·(dl + μ)) — both sides built
    as BIGINTs (exact to ~10^15 corpus tokens; beyond that the
    double conversion is correctly rounded identically), cast DOUBLE
    before the divide, e3 ln-floored PER TERM (fixed term order, the
    bm25 discipline) and summed as BIGINTs; rank (score_e3 DESC,
    doc_id), TakeOrderedAndProject top-k.

    Scale shape: the bm25 shape exactly — one token-count pass picks
    terms, one bounded agg ships (N, cf_t) as driver literals,
    scoring is a pure per-row fold (size(filter(·)) per term, no
    explode, no join, 0 exchanges before the final top-k)."""
    docs = (
        _docs(spark, sf_dir)
        .select("doc_id", "text")
        .where(F.trim("text") != "")
    )
    toks = _lm_tokens()
    term_rows = (
        docs.select(F.explode(toks).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.col("c").desc(), "tok")
        .limit(BM25_N_TERMS)
        .collect()
    )
    terms = [r["tok"] for r in term_rows]
    stats = docs.select(F.explode(toks).alias("tok")).agg(
        F.count(F.lit(1)).cast("long").alias("n_tot"),
        *[
            F.sum((F.col("tok") == t).cast("long")).alias(f"cf{i}")
            for i, t in enumerate(terms)
        ],
    ).collect()[0]
    n_tot = int(stats["n_tot"])
    cfs = [int(stats[f"cf{i}"]) for i in range(len(terms))]

    dl = F.size(toks).cast("long")
    base = docs.select("doc_id", dl.alias("dl"), toks.alias("t"))
    score = None
    for t, cf in zip(terms, cfs):
        term_col = F.expr(
            f"CAST(floor(ln(CAST((size(filter(t, x -> x = '{t}'))"
            f" * {n_tot} + {QLM_MU} * {cf}) AS DOUBLE)"
            f" / CAST(({n_tot} * (dl + {QLM_MU})) AS DOUBLE))"
            " * 1000.0) AS BIGINT)"
        )
        score = term_col if score is None else score + term_col
    from pyspark.sql.window import Window as _W

    ranked = (
        base.select("doc_id", "dl", score.alias("score_e3"))
        .orderBy(F.col("score_e3").desc(), "doc_id")
        .limit(BM25_TOPK)
    )
    return ranked.select(
        "doc_id",
        F.col("dl").alias("n_tokens"),
        "score_e3",
        F.row_number()
        .over(_W.orderBy(F.col("score_e3").desc(), "doc_id"))
        .cast("long")
        .alias("rank"),
    )


def _qlm_sql(
    mu: int = QLM_MU,
    n_terms: int | None = None,
    topk: int | None = None,
) -> str:
    """qlm_topk oracle: the bm25 term CTE, corpus totals, the
    identical integer-rational smoothed probability per term
    (e3-floored, fixed term order), (score DESC, doc_id) top-k."""
    n_terms = BM25_N_TERMS if n_terms is None else n_terms
    topk = BM25_TOPK if topk is None else topk
    return f"""
WITH toks AS MATERIALIZED (
  SELECT doc_id,
         regexp_split_to_array(trim(lower(text)), '[ \\t\\n\\x0B\\f\\r]+') AS t
  FROM documents WHERE trim(text) <> ''
), flat AS MATERIALIZED (
  SELECT doc_id, unnest(t) AS tok FROM toks
), qterms AS (
  SELECT tok, row_number() OVER (ORDER BY c DESC, tok) AS qi FROM (
    SELECT tok, count(*) AS c FROM flat GROUP BY 1
    ORDER BY c DESC, tok LIMIT {n_terms})
), tot AS (
  SELECT CAST(count(*) AS BIGINT) AS n_tot FROM flat
), cf AS (
  SELECT q.qi, q.tok, CAST(count(f.tok) AS BIGINT) AS cf
  FROM qterms q LEFT JOIN flat f ON q.tok = f.tok
  GROUP BY 1, 2
), scored AS (
  SELECT d.doc_id, CAST(len(d.t) AS BIGINT) AS dl,
         CAST(sum(
           floor(ln(CAST((len(list_filter(d.t, x -> x = c.tok)) * tot.n_tot
                          + {mu} * c.cf) AS DOUBLE)
                    / CAST((tot.n_tot * (len(d.t) + {mu})) AS DOUBLE))
                 * 1000.0)
         ) AS BIGINT) AS score_e3
  FROM toks d CROSS JOIN cf c CROSS JOIN tot
  GROUP BY 1, 2
)
SELECT doc_id, dl AS n_tokens, score_e3,
       CAST(row_number() OVER (ORDER BY score_e3 DESC, doc_id) AS BIGINT)
         AS rank
FROM scored
ORDER BY score_e3 DESC, doc_id LIMIT {topk}
"""


def _pl2_term(tf: str, cf: str, dl: str, n_docs: str, total: str) -> str:
    """One PL2 term-score expression — ONE helper spliced into BOTH
    engines (the _g2_term rule): tfn = tf·log2(1 + avgdl/dl) with
    c=1 (avgdl enters as the exact total/n_docs rational), λ = cf/N,
    Poisson-normalized gain (tfn·log2(tfn/λ) + (λ−tfn)·log2 e +
    ½·log2(2π·tfn))/(tfn+1), e3-floored BIGINT per term (tf=0 → 0).
    tf/cf/dl/n_docs/total are spliced texts so Spark passes integer
    literals where the oracle passes columns — identical doubles."""
    tfn = (
        f"(CAST({tf} AS DOUBLE) * log2(1.0 + CAST({total} AS DOUBLE)"
        f" / (CAST({n_docs} AS DOUBLE) * CAST({dl} AS DOUBLE))))"
    )
    lam = f"(CAST({cf} AS DOUBLE) / CAST({n_docs} AS DOUBLE))"
    return (
        f"CASE WHEN {tf} > 0 THEN"
        f" CAST(floor(({tfn} * log2({tfn} / {lam})"
        f" + ({lam} - {tfn}) / ln(2.0)"
        f" + 0.5 * log2(2.0 * pi() * {tfn}))"
        f" / ({tfn} + 1.0) * 1000.0) AS BIGINT)"
        f" ELSE CAST(0 AS BIGINT) END"
    )


def q_pl2_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PL2 divergence-from-randomness retrieval (Amati & van
    Rijsbergen 2002) — the fourth member of the ranking family on the
    SAME deterministic query (bm25 = tf-idf, qlm = language model,
    rrf's dense leg = vectors, this = DFR): a term informs exactly as
    far as its in-document frequency diverges from the Poisson rate a
    random scatter would produce, with Laplace aftereffect
    normalization — the model Terrier ships as its default.

    Cross-engine: every per-term score is `_pl2_term` — ONE expression
    text spliced into both engines; log2/ln/pi() float ops are the
    e3-floor-absorbed class; each term floors to BIGINT BEFORE the
    sum, so the cross-term sum is exact and order-free (the qlm
    oracle's convention).  Rank (pl2_e3 DESC, doc_id), top-k.

    Scale shape: the bm25/qlm shape — one token-count pass picks
    terms, one bounded agg ships (n_docs, total, cf_t) literals,
    scoring is a pure per-row fold, TakeOrderedAndProject top-k."""
    docs = (
        _docs(spark, sf_dir)
        .select("doc_id", "text")
        .where(F.trim("text") != "")
    )
    toks = _lm_tokens()
    term_rows = (
        docs.select(F.explode(toks).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.col("c").desc(), "tok")
        .limit(BM25_N_TERMS)
        .collect()
    )
    terms = [r["tok"] for r in term_rows]
    stats = docs.select(F.size(toks).alias("dl"), toks.alias("t")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("dl").cast("long").alias("total"),
        *[
            F.sum(F.size(F.filter("t", lambda x: x == F.lit(t))))
            .cast("long")
            .alias(f"cf{i}")
            for i, t in enumerate(terms)
        ],
    ).collect()[0]
    n_docs, total = int(stats["n"]), int(stats["total"])
    cfs = [int(stats[f"cf{i}"]) for i in range(len(terms))]

    base = docs.select(
        "doc_id", F.size(toks).cast("long").alias("dl"), toks.alias("t")
    )
    score = None
    for t, cf in zip(terms, cfs):
        term_col = F.expr(
            _pl2_term(
                f"size(filter(t, x -> x = '{t}'))",
                str(cf),
                "dl",
                str(n_docs),
                str(total),
            )
        )
        score = term_col if score is None else score + term_col
    from pyspark.sql.window import Window as _W

    return (
        base.select("doc_id", "dl", score.alias("pl2_e3"))
        .orderBy(F.col("pl2_e3").desc(), "doc_id")
        .limit(BM25_TOPK)
        .select(
            "doc_id",
            F.col("dl").alias("n_tokens"),
            "pl2_e3",
            F.row_number()
            .over(_W.orderBy(F.col("pl2_e3").desc(), "doc_id"))
            .cast("long")
            .alias("rank"),
        )
    )


def _pl2_sql(
    n_terms: int | None = None, topk: int | None = None
) -> str:
    """pl2_topk oracle: the qlm term/cf CTE shape with doc-count +
    token-total stats, the SAME `_pl2_term` text per term (columns
    where Spark splices literals), (pl2_e3 DESC, doc_id) top-k."""
    n_terms = BM25_N_TERMS if n_terms is None else n_terms
    topk = BM25_TOPK if topk is None else topk
    term = _pl2_term(
        "len(list_filter(d.t, x -> x = c.tok))",
        "c.cf",
        "len(d.t)",
        "tot.n_docs",
        "tot.total",
    )
    return f"""
WITH toks AS MATERIALIZED (
  SELECT doc_id,
         regexp_split_to_array(trim(lower(text)), '[ \\t\\n\\x0B\\f\\r]+') AS t
  FROM documents WHERE trim(text) <> ''
), flat AS MATERIALIZED (
  SELECT doc_id, unnest(t) AS tok FROM toks
), qterms AS (
  SELECT tok FROM (
    SELECT tok, count(*) AS c FROM flat GROUP BY 1
    ORDER BY c DESC, tok LIMIT {n_terms})
), tot AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(len(t)) AS BIGINT) AS total
  FROM toks
), cf AS (
  SELECT q.tok, CAST(count(f.tok) AS BIGINT) AS cf
  FROM qterms q LEFT JOIN flat f ON q.tok = f.tok
  GROUP BY 1
), scored AS (
  SELECT d.doc_id, CAST(len(d.t) AS BIGINT) AS dl,
         CAST(sum({term}) AS BIGINT) AS pl2_e3
  FROM toks d CROSS JOIN cf c CROSS JOIN tot
  GROUP BY 1, 2
)
SELECT doc_id, dl AS n_tokens, pl2_e3,
       CAST(row_number() OVER (ORDER BY pl2_e3 DESC, doc_id) AS BIGINT)
         AS rank
FROM scored
ORDER BY pl2_e3 DESC, doc_id LIMIT {topk}
"""


def q_borda_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Borda-count fusion of the lexical ranking trio (Borda 1781 via
    the rank-fusion literature, e.g. Aslam & Montague 2001) — the
    LINEAR-points companion of `rrf_fusion`'s reciprocal rule, over
    the bm25 / qlm / pl2 top-k lists on the SAME deterministic
    query: each list awards TOPK+1−rank points, absent docs score 0,
    and the fused order is (borda DESC, doc_id).  Emits per fused
    doc its points and how many of the three lists carried it — the
    consensus-vs-single-model signal a ranker evaluation reads.

    Cross-engine: all three inputs are already oracle-proven ranked
    lists; points/sums are pure BIGINT; the oracle splices the FULL
    `_bm25_sql`/`_qlm_sql`/`_pl2_sql` as subquery CTEs (the rrf
    splice precedent — all three rankers' constants flow in).

    Scale shape: three bounded top-k lists (each the bm25 plan) →
    a union of 3·TOPK rows → one tiny agg + fixed-k top-k."""
    lists = [
        q_bm25_topk(spark, sf_dir).select("doc_id", "rank"),
        q_qlm_topk(spark, sf_dir).select("doc_id", "rank"),
        q_pl2_topk(spark, sf_dir).select("doc_id", "rank"),
    ]
    pts = None
    for df in lists:
        p = df.select(
            "doc_id",
            (F.lit(BM25_TOPK + 1) - F.col("rank")).cast("long").alias("pt"),
        )
        pts = p if pts is None else pts.unionByName(p)
    from pyspark.sql.window import Window as _W

    agg = pts.groupBy("doc_id").agg(
        F.sum("pt").cast("long").alias("borda"),
        F.count(F.lit(1)).cast("long").alias("n_lists"),
    )
    return (
        agg.orderBy(F.desc("borda"), "doc_id")
        .limit(BM25_TOPK)
        .select(
            "doc_id",
            "borda",
            "n_lists",
            F.row_number()
            .over(_W.orderBy(F.desc("borda"), "doc_id"))
            .cast("long")
            .alias("rank"),
        )
    )


def _borda_fusion_sql(topk: int | None = None) -> str:
    """borda_fusion oracle: the three full ranker SQLs spliced as
    subquery CTEs, identical linear points, (borda DESC, doc_id)
    fixed-k."""
    topk = BM25_TOPK if topk is None else topk
    return f"""
WITH bm AS (
{_bm25_sql()}
), ql AS (
{_qlm_sql()}
), pl AS (
{_pl2_sql()}
), pts AS (
  SELECT doc_id, CAST({topk} + 1 - rank AS BIGINT) AS pt FROM bm
  UNION ALL
  SELECT doc_id, CAST({topk} + 1 - rank AS BIGINT) FROM ql
  UNION ALL
  SELECT doc_id, CAST({topk} + 1 - rank AS BIGINT) FROM pl
), agg AS (
  SELECT doc_id, CAST(sum(pt) AS BIGINT) AS borda,
         CAST(count(*) AS BIGINT) AS n_lists
  FROM pts GROUP BY 1
)
SELECT doc_id, borda, n_lists,
       CAST(row_number() OVER (ORDER BY borda DESC, doc_id) AS BIGINT)
         AS rank
FROM agg
ORDER BY borda DESC, doc_id LIMIT {topk}
"""


# RRF constants — MIRRORED in `_rrf_fusion_sql`; change together.
# The doc_id == vec_id row correspondence between documents and
# embeddings is part of the spec (first query to consume it).
RRF_K = 60
RRF_TOPK = 20


def q_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval via reciprocal-rank fusion (Cormack et al.
    2009) — the standard way a RAG/search pipeline combines the sparse
    and dense rankers this repo already ships: the lexical list is
    `bm25_topk`'s top-``BM25_TOPK``; the dense list is a
    pseudo-relevance-feedback expansion — cosine top-``RRF_TOPK`` to
    the EMBEDDING OF THE TOP-1 BM25 HIT (deterministic, so the whole
    hybrid query is oracle-mirrorable); fused score per doc over the
    union: rrf_e6 = Σ_lists 1e6 DIV (RRF_K + rank), absent list → 0.

    Cross-engine exactness: the lexical ranks are the proven
    `bm25_topk` output; dense ranks order by the e5-floored cosine
    (`_cosine_cols` index-order fold ↔ DuckDB list_cosine_similarity
    ::DOUBLE[], the knn_graph discipline) with (cos_e5 DESC, doc_id)
    tie-break; 1e6 DIV (K + r) truncates identically on both engines
    (Spark DIV == DuckDB // toward zero on positives); doc_id ==
    vec_id is the documents↔embeddings correspondence.

    Scale shape: both input lists are top-k bounded (the lexical side
    is the bm25 pure-row-fold + TakeOrderedAndProject; the dense side
    is ONE literal-query pure map + TakeOrderedAndProject — the
    single-query brute-force shape, no join against the corpus); the
    fusion itself is a ≤2k-row full outer join + top-k — metadata
    scale end to end past the two scans."""
    from pyspark.sql.window import Window

    lex = q_bm25_topk(spark, sf_dir).select(
        "doc_id", F.col("rank").alias("r_lex")
    )
    qid = lex.where(F.col("r_lex") == 1).collect()[0]["doc_id"]
    emb = _emb(spark, sf_dir)
    qvec = emb.where(F.col("vec_id") == qid).collect()[0]["embedding"]
    qlit = F.array(*[F.lit(float(x)) for x in qvec])
    cos_e5 = F.floor(
        _cosine_cols(F.col("embedding"), qlit) * F.lit(100000.0)
    ).cast("long")
    dense = (
        emb.select(F.col("vec_id").alias("doc_id"), cos_e5.alias("cos_e5"))
        .orderBy(F.col("cos_e5").desc(), "doc_id")
        .limit(RRF_TOPK)
        .select(
            "doc_id",
            F.row_number()
            .over(Window.orderBy(F.col("cos_e5").desc(), F.col("doc_id")))
            .cast("long")
            .alias("r_dense"),
        )
    )
    u = lex.join(dense, "doc_id", "full").select(
        "doc_id",
        F.coalesce("r_lex", F.lit(0)).cast("long").alias("r_lex"),
        F.coalesce("r_dense", F.lit(0)).cast("long").alias("r_dense"),
    )
    rrf = (
        F.when(
            F.col("r_lex") > 0,
            F.expr(f"1000000 DIV ({RRF_K} + r_lex)"),
        ).otherwise(F.lit(0))
        + F.when(
            F.col("r_dense") > 0,
            F.expr(f"1000000 DIV ({RRF_K} + r_dense)"),
        ).otherwise(F.lit(0))
    )
    return (
        u.select(
            "doc_id", "r_lex", "r_dense", rrf.cast("long").alias("rrf_e6")
        )
        .orderBy(F.col("rrf_e6").desc(), "doc_id")
        .limit(RRF_TOPK)
        .select(
            "doc_id",
            "r_lex",
            "r_dense",
            "rrf_e6",
            F.row_number()
            .over(Window.orderBy(F.col("rrf_e6").desc(), F.col("doc_id")))
            .cast("long")
            .alias("rank"),
        )
    )


_HEX = "0123456789abcdef"


def _hex_digit_map() -> F.Column:
    """Literal map hex-char → value, the cross-engine-safe way to turn
    md5 hex chars into integers (Spark conv() has no DuckDB twin)."""
    return F.create_map(
        *[F.lit(x) for i, c in enumerate(_HEX) for x in (c, i)]
    )


def _token_bucket(tok: F.Column, hexmap: F.Column) -> F.Column:
    """Deterministic token → [0, 64) feature bucket: first two hex
    chars of md5(tok) (identical on both engines) → integer % 64."""
    h = F.md5(tok)
    v = hexmap[F.substring(h, 1, 1)] * 16 + hexmap[F.substring(h, 2, 1)]
    return v % 64


# Count-min-sketch constants — MIRRORED in `_cms_sql`; change together.
CMS_D = 4  # independent hash rows
CMS_W = 512  # buckets per row
CMS_TOPK = 20


def _cms_bucket(tok: F.Column, i: int, hexmap: F.Column) -> F.Column:
    """Hash row i's bucket for ``tok``: first 3 hex chars of
    md5(tok || '#i') → [0, 4096) → % CMS_W.  Salting the input (not
    the hash) keeps the rows independent with one md5 primitive both
    engines share."""
    h = F.md5(F.concat(tok, F.lit(f"#{i}")))
    v = (
        hexmap[F.substring(h, 1, 1)] * 256
        + hexmap[F.substring(h, 2, 1)] * 16
        + hexmap[F.substring(h, 3, 1)]
    )
    return (v % CMS_W).cast("int")


def q_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min-sketch heavy hitters (Cormode & Muthukrishnan 2005):
    estimate term frequencies from a bounded ``CMS_D × CMS_W`` counter
    grid and report the corpus's top-``CMS_TOPK`` terms with exact
    count, sketch estimate, and overcount.  This is the bounded-state
    member of the corpus-stats family: an exact term count at 100 TB
    shuffles the full token stream by term (unbounded key cardinality),
    while the sketch aggregates into 2 048 cells with map-side combine
    — the same metadata-scale-summary design point as
    `quality_quantile_gate_approx` — and estimates any term's count
    after the fact; the exact count here is the verification anchor
    the driver gate needs.

    Everything is integer arithmetic on md5-derived buckets (identical
    on both engines), so the oracle is hash-exact, and the CMS
    guarantee est >= exact holds structurally (every occurrence lands
    in all D of its buckets).

    Scale shape: 2 corpus passes, each ONE exchange with partial aggs
    — the sketch pass reduces to 2 048 cells, the anchor pass to a
    per-term agg + TakeOrderedAndProject; estimation joins the 20
    candidate terms' 80 exploded buckets against the broadcast
    2 048-row sketch."""
    docs = _docs(spark, sf_dir).select("doc_id", "text").where(
        F.trim("text") != ""
    )
    hexmap = _hex_digit_map()
    tok_df = docs.select(F.explode(_lm_tokens()).alias("tok"))

    def buckets(tok: F.Column) -> F.Column:
        return F.array(*[_cms_bucket(tok, i, hexmap) for i in range(CMS_D)])

    sketch = (
        tok_df.select(F.posexplode(buckets(F.col("tok"))).alias("row_i", "bucket"))
        .groupBy("row_i", "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    topk = (
        tok_df.groupBy("tok")
        .agg(F.count(F.lit(1)).cast("long").alias("exact_cnt"))
        .orderBy(F.col("exact_cnt").desc(), "tok")
        .limit(CMS_TOPK)
    )
    cand = topk.select(
        "tok",
        "exact_cnt",
        F.posexplode(buckets(F.col("tok"))).alias("row_i", "bucket"),
    )
    est = (
        cand.join(F.broadcast(sketch), ["row_i", "bucket"])
        .groupBy("tok", "exact_cnt")
        .agg(F.min("cnt").alias("cms_est"))
    )
    return est.select(
        "tok",
        "exact_cnt",
        "cms_est",
        (F.col("cms_est") - F.col("exact_cnt")).alias("overcount"),
    )


def _cms_sql() -> str:
    """CMS oracle: identical md5-hex buckets, sketch cells, exact
    top-k anchor, and min-over-rows estimate — pure integer arithmetic
    end to end, so the match is exact by construction."""

    def bucket(tok: str, i: int) -> str:
        h = f"md5({tok} || '#{i}')"
        return (
            f"(((strpos('0123456789abcdef', substr({h}, 1, 1)) - 1) * 256"
            f" + (strpos('0123456789abcdef', substr({h}, 2, 1)) - 1) * 16"
            f" + (strpos('0123456789abcdef', substr({h}, 3, 1)) - 1))"
            f" % {CMS_W})"
        )

    cell_rows = "\n  UNION ALL\n".join(
        f"  SELECT {i} AS row_i, {bucket('tok', i)} AS bucket FROM tk"
        for i in range(CMS_D)
    )
    cand_rows = "\n  UNION ALL\n".join(
        f"  SELECT tok, exact_cnt, {i} AS row_i, {bucket('tok', i)} AS bucket"
        f" FROM exact"
        for i in range(CMS_D)
    )
    return f"""
WITH d AS (
  SELECT regexp_split_to_array(trim(lower(text)), '[ \\t\\n\\x0B\\f\\r]+') AS t
  FROM documents WHERE trim(text) <> ''
), tk AS (
  SELECT unnest(t) AS tok FROM d
), cell_src AS (
{cell_rows}
), cells AS (
  SELECT row_i, bucket, CAST(count(*) AS BIGINT) AS cnt
  FROM cell_src GROUP BY 1, 2
), exact AS (
  SELECT tok, CAST(count(*) AS BIGINT) AS exact_cnt
  FROM tk GROUP BY 1 ORDER BY exact_cnt DESC, tok LIMIT {CMS_TOPK}
), cand AS (
{cand_rows}
), est AS (
  SELECT tok, exact_cnt, min(cnt) AS cms_est
  FROM cand JOIN cells USING (row_i, bucket)
  GROUP BY 1, 2
)
SELECT tok, exact_cnt, cms_est, cms_est - exact_cnt AS overcount
FROM est
"""


def q_dsir_weights(
    spark: SparkSession, sf_dir: str, n_buckets: int = 64, target_lang: str = "en"
) -> DataFrame:
    """DSIR-style importance weights (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling"): score every raw
    doc by the mean log-likelihood ratio of its hashed unigram features
    under a target-domain vs raw unigram distribution — the standard
    move for steering a web-scale corpus toward a target domain without
    training a classifier.  Target here = the ``target_lang`` slice of
    the same corpus (deterministic, so the oracle can mirror it).

    Scale shape: ONE corpus pass reduces the token stream to a
    64-bucket (c_raw, c_target) table (hash agg with map-side combine —
    bounded output at any corpus size); the Laplace-smoothed log-ratio
    vector is computed driver-side (metadata-scale, the lm_score vocab
    pattern) and ships back as a LITERAL array; scoring is a pure
    per-row fold over JVM-computed buckets — the token stream never
    shuffles for scoring and the scoring pass has zero exchanges.

    Cross-engine exactness: md5 hex + the hex-digit map give identical
    buckets; (c+1)/(t+B) is the identical rational double; ln() args
    match so the per-token log-ratios match; the per-doc mean is
    rounded to 3 dp to absorb fold-vs-group sum order."""
    docs = _docs(spark, sf_dir).select("doc_id", "lang", "text")
    return dsir_weights_for(docs, n_buckets, target_lang)


def dsir_weights_for(
    docs: DataFrame, n_buckets: int = 64, target_lang: str = "en"
) -> DataFrame:
    """The reusable form of `q_dsir_weights` over an arbitrary
    (doc_id, lang, text) frame — jobs compose it on their own gated
    corpus (see jobs/run_corpus_build.py --sample-mode dsir)."""
    import math

    toks = _lm_tokens()
    hexmap = _hex_digit_map()

    counts = (
        docs.where(F.trim("text") != "")
        .select("lang", F.explode(toks).alias("tok"))
        .select(
            _token_bucket(F.col("tok"), hexmap).alias("bucket"),
            (F.col("lang") == target_lang).cast("long").alias("is_tgt"),
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("c_raw"),
            F.sum("is_tgt").alias("c_tgt"),
        )
        .collect()
    )
    raw = {int(r["bucket"]): int(r["c_raw"]) for r in counts}
    tgt = {int(r["bucket"]): int(r["c_tgt"]) for r in counts}
    t_raw, t_tgt = sum(raw.values()), sum(tgt.values())
    lr = [
        math.log((tgt.get(b, 0) + 1) / (t_tgt + n_buckets))
        - math.log((raw.get(b, 0) + 1) / (t_raw + n_buckets))
        for b in range(n_buckets)
    ]
    lr_arr = F.array(*[F.lit(v) for v in lr])

    lrs = F.transform(
        toks, lambda t: F.element_at(lr_arr, _token_bucket(t, hexmap) + 1)
    )
    n_tok = F.size(toks)
    weight = F.aggregate(lrs, F.lit(0.0), lambda a, x: a + x) / n_tok.cast(
        "double"
    )
    return docs.where(F.trim("text") != "").select(
        "doc_id",
        "lang",
        n_tok.cast("long").alias("n_tokens"),
        # + 0.0 normalizes IEEE -0.0 (a near-target doc can round to
        # exactly zero from below; DuckDB keeps the sign, Spark doesn't)
        (round3_stable(weight) + F.lit(0.0)).alias("dsir_weight"),
    )


def dsir_select_top_frac(w: DataFrame, frac: float) -> DataFrame:
    """Scale-safe EXACT top-`frac` selection by `dsir_weight` — the
    100-TB shape of what `orderBy(desc).limit(k)` means when k is half
    the corpus (TakeOrderedAndProject merges the top-k on the DRIVER,
    so a corpus-sized k is a driver OOM, not just a slow sort).

    Same two-pass shape as `quality_gate_thresholds`: dsir_weight is a
    stable 1e-3 multiple (round3_stable), so floor(w*1e3+0.5) is its
    EXACT integer numerator on any engine — pass 1 reduces the corpus
    to a bounded histogram over those integers (weights are mean log
    ratios, |w| ≲ 20 → ≤ ~4·10^4 buckets at ANY corpus size; the
    collect is metadata-scale) and derives the threshold bucket b for
    k = max(1, int(frac * n_scoreable)).  Pass 2 keeps every doc with
    bucket > b via a PURE-MAP filter, then tops up the remainder from
    bucket b alone with orderBy+limit — within a bucket all rounded
    weights are EQUAL, so the doc_id-ascending top-up reproduces the
    old global `orderBy(desc(weight), doc_id).limit(k)` selection
    bit-for-bit while the driver-side merge shrinks from k rows to
    (k - n_above) rows of ONE bucket (expected corpus/n_buckets; a
    degenerate all-one-weight corpus degrades to the old top-k, never
    worse).

    Returns (doc_id) — exactly k rows when the input has ≥ k docs."""
    wb = F.floor(F.col("dsir_weight") * F.lit(1000.0) + F.lit(0.5)).cast(
        "long"
    )
    hist = (
        w.groupBy(wb.alias("wb"))
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .collect()
    )
    buckets = {int(r["wb"]): int(r["c"]) for r in hist}
    n_scoreable = sum(buckets.values())
    k = max(1, int(n_scoreable * frac))
    cum = 0
    thr = None
    for b in sorted(buckets, reverse=True):
        if cum + buckets[b] >= k:
            thr = b
            break
        cum += buckets[b]
    if thr is None:  # frac >= 1: keep everything
        return w.select("doc_id")
    above = w.where(wb > thr).select("doc_id")
    boundary = (
        w.where(wb == thr)
        .orderBy("doc_id")
        .limit(k - cum)
        .select("doc_id")
    )
    return above.unionByName(boundary)


def q_dsir_topfrac(
    spark: SparkSession, sf_dir: str, frac: float = 0.5
) -> DataFrame:
    """The DSIR corpus-selection operator end-to-end: weights, then the
    scale-safe histogram-threshold top-`frac` selection
    (`dsir_select_top_frac`) — the shape jobs/run_corpus_build.py
    --sample-mode dsir runs.  The oracle expresses the identical
    selection as a window rank (the selection is pytest-locked
    bit-identical to global top-k), so the driver value-hashes the
    EXACT kept set and its weights."""
    docs = _docs(spark, sf_dir).select("doc_id", "lang", "text")
    w = dsir_weights_for(docs).localCheckpoint(eager=False)
    kept = dsir_select_top_frac(w, frac)
    return kept.join(
        w.select("doc_id", "lang", "dsir_weight"), "doc_id"
    ).select("doc_id", "lang", "dsir_weight")


def q_lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _docs(spark, sf_dir)
        .select("lang", lang_guess().alias("lang_guess"))
        .groupBy("lang", "lang_guess")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# --- dedup ---------------------------------------------------------------------

def q_exact_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    return exact_dup_groups(with_injected_dups(_docs(spark, sf_dir)))


def q_normalized_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    return normalized_dup_groups(with_injected_dups(_docs(spark, sf_dir)))


def q_soft_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SoftDeDup frequency-based down-weighting (He et al., ACL
    2024 — reweight duplicated text instead of dropping it): every
    doc keeps a sampling weight 1/dup_count of its
    exact-text group, so a page crawled 40 times contributes one
    page of gradient mass, not 40, while its text stays in the
    corpus.  Runs on the injected-dup corpus (the dedup_exact
    convention) so the group structure is deterministic; outputs the
    per-doc weight and the effective (down-weighted) token mass —
    all exact BIGINTs: weight_e6 = 1e6 DIV dup_count,
    eff_tokens_e6 = n_tokens * weight_e6 (MIRRORED in the
    `soft_dedup` oracle SQL; change together).

    Scale shape: ONE whole-partition window over md5(text) — the
    same single shuffle exact dedup already pays, with no join-back
    second pass; the weight/mass arithmetic is a pure map.
    Reference analog: P8 dedup-preserve-order semantics
    (/root/reference/internal/core/domain_extractor.go) extended
    with a retention policy instead of a drop."""
    from pyspark.sql.window import Window

    from rxtls_spark.functions.text import token_count

    docs = with_injected_dups(_docs(spark, sf_dir))
    w = Window.partitionBy("h")
    hashed = docs.select(
        "doc_id", token_count().alias("n_tokens"), F.md5("text").alias("h")
    )
    grouped = hashed.select(
        "doc_id",
        "n_tokens",
        F.min("doc_id").over(w).alias("group_root"),
        F.count(F.lit(1)).over(w).cast("long").alias("dup_count"),
    )
    return grouped.select(
        "doc_id",
        "group_root",
        "dup_count",
        F.expr("CAST(1000000 DIV dup_count AS BIGINT)").alias("weight_e6"),
        "n_tokens",
        F.expr(
            "CAST(n_tokens * (1000000 DIV dup_count) AS BIGINT)"
        ).alias("eff_tokens_e6"),
    )


# CDC boundary divisor (mean chunk ≈ CDC_DIV tokens) — MIRRORED in the
# `cdc_chunk_dedup` oracle SQL; change together.  Boundary rule: AFTER
# token i when its md5-13-hex-prefix integer key (the bloom_dedup
# conv(_,16,10) == '0x'||_ pairing) % CDC_DIV == 0, plus a forced
# boundary at end-of-doc.
CDC_DIV = 8


def q_cdc_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined-chunking dedup accounting (the rsync/LBFS
    boundary idea at token granularity): each document is cut into
    variable-length chunks whose boundaries depend only on LOCAL token
    content — so a one-token edit moves at most one boundary and every
    OTHER chunk still hashes identically, which is exactly what
    fixed-width `span_dedup` windows cannot give you.  The injected
    near-copy (' extra!') proves the property: all its chunks dedup
    against the original except the final one.

    Per doc over the injected-dup corpus (the dedup_exact convention):
    chunk count, token count, and the chunks/tokens already seen at an
    earlier (doc_id, chunk_idx) — the storage/compute a chunk-level
    dedup store saves.  Chunks are maximal runs between boundary
    tokens; first-setter rule = min (doc_id, chunk_idx) per chunk
    hash.  All BIGINT — exact cross-engine.

    Scale shape: chunking is a PURE per-row array map (no explode, no
    window — boundary positions, [0]-seeded fence array, slice+md5
    per chunk); the only shuffles are the chunk-hash agg + join-back
    — the exact-dedup shuffle paid at chunk granularity, which is the
    entire point of CDC — and the final per-doc agg."""
    docs = with_injected_dups(_docs(spark, sf_dir)).where(
        F.trim("text") != ""
    )
    base = docs.select("doc_id", _lm_tokens().alias("t"))

    def key(tok: F.Column) -> F.Column:
        return F.conv(F.substring(F.md5(tok), 1, 13), 16, 10).cast("long")

    ends = F.filter(
        F.sequence(F.lit(1), F.size("t")),
        lambda i: (i == F.size("t"))
        | (key(F.element_at(F.col("t"), i)) % CDC_DIV == 0),
    )
    # fence array [0, end_1, ..., end_m]: chunk k spans e2[k]+1 .. e2[k+1]
    withe = base.select(
        "doc_id", "t", F.concat(F.array(F.lit(0)), ends).alias("e2")
    )
    chunks = F.transform(
        F.sequence(F.lit(1), F.size("e2") - 1),
        lambda k: F.struct(
            F.md5(
                F.concat_ws(
                    " ",
                    F.slice(
                        F.col("t"),
                        F.element_at(F.col("e2"), k) + 1,
                        F.element_at(F.col("e2"), k + 1)
                        - F.element_at(F.col("e2"), k),
                    ),
                )
            ).alias("h"),
            (
                F.element_at(F.col("e2"), k + 1)
                - F.element_at(F.col("e2"), k)
            )
            .cast("long")
            .alias("ntok"),
        ),
    )
    rows = withe.select(
        "doc_id", F.posexplode(chunks).alias("chunk_idx", "c")
    ).select(
        "doc_id",
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.col("c.h").alias("h"),
        F.col("c.ntok").alias("ntok"),
    )
    firsts = rows.groupBy("h").agg(
        F.min(F.struct("doc_id", "chunk_idx")).alias("f")
    )
    flagged = rows.join(firsts, "h").select(
        "doc_id",
        "ntok",
        (
            (F.col("f.doc_id") == F.col("doc_id"))
            & (F.col("f.chunk_idx") == F.col("chunk_idx"))
        ).alias("is_first"),
    )
    return flagged.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_chunks"),
        F.sum("ntok").cast("long").alias("n_tokens"),
        F.sum(F.when(~F.col("is_first"), 1).otherwise(0))
        .cast("long")
        .alias("dup_chunks"),
        F.sum(F.when(~F.col("is_first"), F.col("ntok")).otherwise(0))
        .cast("long")
        .alias("saved_tokens"),
    )


def _cdc_sql(div: int = CDC_DIV) -> str:
    """cdc_chunk_dedup oracle: identical fence-array chunking (the
    [0]-seeded boundary list), md5 chunk hashes over the space-joined
    slice, row_number first-setter rule — all BIGINT."""
    return (
        _DUPS_CTE
        + f""", toks AS (
  SELECT doc_id,
         regexp_split_to_array(trim(lower(text)),
                               '[ \\t\\n\\x0B\\f\\r]+') AS t
  FROM docs WHERE trim(text) <> ''
), fences AS (
  SELECT doc_id, t,
         [0] || list_filter(generate_series(1, len(t)),
           i -> i = len(t) OR
                ('0x' || substring(md5(t[i]), 1, 13))::BIGINT % {div} = 0)
           AS e2
  FROM toks
), ks AS (
  SELECT doc_id, t, e2,
         unnest(generate_series(1, len(e2) - 1)) AS k
  FROM fences
), rows0 AS (
  SELECT doc_id, CAST(k - 1 AS BIGINT) AS chunk_idx,
         md5(array_to_string(t[(e2[k] + 1):(e2[k + 1])], ' ')) AS h,
         CAST(e2[k + 1] - e2[k] AS BIGINT) AS ntok
  FROM ks
), fl AS (
  SELECT doc_id, ntok,
         row_number() OVER (PARTITION BY h
                            ORDER BY doc_id, chunk_idx) AS rn
  FROM rows0
)
SELECT doc_id,
  CAST(count(*) AS BIGINT) AS n_chunks,
  CAST(sum(ntok) AS BIGINT) AS n_tokens,
  CAST(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT) AS dup_chunks,
  CAST(sum(CASE WHEN rn > 1 THEN ntok ELSE 0 END) AS BIGINT)
    AS saved_tokens
FROM fl GROUP BY 1
"""
    )


def _word_shingles(col):
    """Word-3-gram array — pure JVM (split/transform/slice), mirrored
    1:1 by the DuckDB regexp_split_to_array/list_transform SQL."""
    words = F.split(F.lower(F.trim(col)), "[ \\t\\n\\x0B\\f\\r]+")
    n = F.size(words)
    return F.when(
        n >= 3,
        F.transform(
            F.sequence(F.lit(1), n - 2),
            lambda i: F.concat_ws(" ", F.slice(words, i, 3)),
        ),
    ).otherwise(F.array(F.concat_ws(" ", words)))


def _near_pairs(docs: DataFrame) -> DataFrame:
    """(doc_a, doc_b=doc_a+2e9, jaccard) for the injected near copies,
    Jaccard from string shingles — a pure doc_id/text formula both
    engines evaluate identically."""
    base = docs.where(F.col("doc_id") % 20 == 0).select("doc_id", "text")
    sa = _word_shingles(F.col("text"))
    sb = _word_shingles(F.concat(F.col("text"), F.lit(" extra!")))
    inter = F.size(F.array_intersect(sa, sb)).cast("double")
    union = F.size(F.array_union(sa, sb)).cast("double")
    return base.select(
        F.col("doc_id").alias("doc_a"),
        (F.col("doc_id") + F.lit(2_000_000_000)).alias("doc_b"),
        F.round(inter / union, 5).alias("jaccard"),
    )


def _expected_minhash_pairs(docs: DataFrame) -> DataFrame:
    """The injected pairs the LSH pipeline MUST recover, with their
    string-shingle Jaccard (exact copies: 1.0; near copies: computed
    with the same JVM array ops as q_ngram_jaccard).  Pairs below the
    0.7 pipeline threshold are excluded on both engines identically."""
    exact = docs.where(F.col("doc_id") % 20 == 0).select(
        F.col("doc_id").alias("doc_a"),
        (F.col("doc_id") + F.lit(1_000_000_000)).alias("doc_b"),
        F.lit(1.0).alias("jaccard"),
    )
    return exact.unionByName(_near_pairs(docs)).where(F.col("jaccard") >= 0.7)


def q_minhash_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Injected-pair recovery — oracle-checkable even though minhash
    signatures aren't SQL-expressible: the expected pair set and its
    Jaccard are pure doc_id/text formulas, and `recovered` must be 1
    for every row (exact copies share all bands structurally; near
    copies sit far above the threshold).  Full pair-set semantics stay
    locked by tests/test_dedup.py brute-force comparisons."""
    docs = _docs(spark, sf_dir)
    rec = minhash_near_dups(with_injected_dups(docs), 0.7).select(
        "doc_a", "doc_b", F.lit(1).alias("hit")
    )
    return (
        _expected_minhash_pairs(docs)
        .join(rec, ["doc_a", "doc_b"], "left")
        .select(
            "doc_a",
            "doc_b",
            "jaccard",
            F.coalesce(F.col("hit"), F.lit(0)).cast("long").alias("recovered"),
        )
    )


def q_simhash_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-copy recovery through the simhash pipeline: identical text
    → identical signature → hamming 0 and all 4 bands equal, so every
    (d, d+1e9) pair is structurally guaranteed — any pipeline break
    (banding, join, popcount, cap) flips a row and fails the hash."""
    docs = _docs(spark, sf_dir)
    rec = simhash_near_dups(with_injected_dups(docs), 3).select(
        "doc_a", "doc_b", "hamming"
    )
    expected = docs.where(F.col("doc_id") % 20 == 0).select(
        F.col("doc_id").alias("doc_a"),
        (F.col("doc_id") + F.lit(1_000_000_000)).alias("doc_b"),
    )
    return expected.join(rec, ["doc_a", "doc_b"], "left").select(
        "doc_a",
        "doc_b",
        F.coalesce(F.col("hamming"), F.lit(-1)).cast("int").alias("hamming"),
    )


def _deterministic_pair_graph(docs: DataFrame, injected: DataFrame) -> DataFrame:
    """Exact md5 dup groups (star pairs from each group's min id) plus
    the formula near pairs — a pair graph DuckDB can rebuild exactly."""
    groups = injected.groupBy(F.md5("text").alias("h")).agg(
        F.min("doc_id").alias("root"), F.count(F.lit(1)).alias("n")
    )
    exact_pairs = (
        injected.select(F.md5("text").alias("h"), "doc_id")
        .join(groups.where(F.col("n") > 1), "h")
        .where(F.col("doc_id") != F.col("root"))
        .select(F.col("root").alias("doc_a"), F.col("doc_id").alias("doc_b"))
    )
    near_pairs = (
        _near_pairs(docs).where(F.col("jaccard") >= 0.7).select("doc_a", "doc_b")
    )
    return exact_pairs.unionByName(near_pairs)


def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster resolution (connected components + keep-list) over a
    DETERMINISTIC pair graph — exact md5 dup groups (star pairs from
    each group's min id) plus the formula near pairs — so DuckDB can
    mirror the transitive closure with WITH RECURSIVE.  The LSH→CC
    composition on the full minhash pair set is locked by
    tests/test_cluster.py against brute-force union-find."""
    from rxtls_spark.operators.cluster import dedup_keep_list

    docs = _docs(spark, sf_dir)
    injected = with_injected_dups(docs)
    pairs = _deterministic_pair_graph(docs, injected)
    return dedup_keep_list(pairs).select(
        "doc_id",
        "cluster_root",
        F.col("n_cluster").cast("long").alias("n_cluster"),
        F.col("keep").cast("long").alias("keep"),
    )


def q_training_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end corpus build: inject dups → cluster → drop
    non-keepers → quality/lang/token features → quality gate → per-lang
    training-mix stats.  Every stage is SQL-mirrored, so the whole
    composition is value-hash checked."""
    from rxtls_spark.operators.cluster import dedup_keep_list

    docs = _docs(spark, sf_dir)
    injected = with_injected_dups(docs)
    pairs = _deterministic_pair_graph(docs, injected)
    drops = dedup_keep_list(pairs).where(~F.col("keep")).select("doc_id")
    corpus = injected.join(drops, "doc_id", "left_anti")
    feats = corpus.select(
        "doc_id",
        "lang",
        quality_score().alias("quality"),  # already on the 5-dp grid
        token_count().alias("n_tokens"),
        lang_guess().alias("lang_guess"),
    )
    gated = feats.where(F.col("quality") >= 0.3)
    return gated.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("n_tokens"),
        F.round(F.avg("quality"), 5).alias("avg_quality"),
        F.sum(F.when(F.col("lang_guess") == F.col("lang"), 1).otherwise(0))
        .cast("long")
        .alias("n_lang_match"),
    )


def q_doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprints via injected-copy agreement — oracle-
    checkable even though the xxh3 rolling-hash values aren't SQL-
    expressible: an exact copy (doc_id+1e9) must produce an IDENTICAL
    fingerprint set, so (fingerprints_equal, n_fp_equal, has_fp) are
    all structurally 1 and DuckDB predicts the rows exactly.  Any break
    in shingling, winnowing, or the hash flips a row and fails the
    value hash.  The per-doc fingerprint surface itself stays locked by
    tests/test_dedup.py winnow properties."""
    from rxtls_spark.operators.dedup import fingerprint_udf

    docs = _docs(spark, sf_dir)
    fps = with_injected_dups(docs).select(
        "doc_id", fingerprint_udf(F.col("text")).alias("fp")
    )
    orig = fps.where(
        (F.col("doc_id") % 20 == 0) & (F.col("doc_id") < 1_000_000_000)
    ).select(F.col("doc_id").alias("doc_a"), F.col("fp").alias("fp_a"))
    copies = fps.where(
        (F.col("doc_id") >= 1_000_000_000) & (F.col("doc_id") < 2_000_000_000)
    ).select(F.col("doc_id").alias("doc_b"), F.col("fp").alias("fp_b"))
    return (
        orig.join(copies, copies["doc_b"] == orig["doc_a"] + 1_000_000_000)
        .select(
            "doc_a",
            "doc_b",
            (F.col("fp_a") == F.col("fp_b")).cast("long").alias(
                "fingerprints_equal"
            ),
            (F.size("fp_a") == F.size("fp_b")).cast("long").alias("n_fp_equal"),
            (F.size("fp_a") >= 1).cast("long").alias("has_fp"),
        )
    )


def q_edit_verify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact edit-distance VERIFICATION of near-dup candidates — the
    stage a production near-dup pipeline runs after LSH banding: LSH
    proposes pairs cheaply, Levenshtein (or exact Jaccard) confirms
    them before anything is dropped.  `ngram_jaccard` validates the
    set-similarity verifier; this validates the sequence-similarity
    one, which catches reorderings Jaccard is blind to.

    Candidate pairs are deterministic variants of the standard query
    pool (doc_id % 20 == 0, the injected-dup convention), each with a
    PROVABLE distance identity the pytest locks: `append` (+' extra!',
    d = 7), `sub` (every 'a'→'b', d = #a — substitutions only),
    `half` (left half kept, d = n − n DIV 2 — deletions only), `rev`
    (reversed text, d from the full DP).  Outputs are all exact
    BIGINTs: d, both lengths, and sim_e5 = ((maxlen − d)·1e5) DIV
    maxlen — both engines run their built-in unit-cost Levenshtein on
    identical strings.

    Scale shape: a pure per-row map over the candidate pairs (the
    pool is the metadata-scale query set; at 100 TB the pairs come
    from the LSH band join, which is exactly where this expression
    drops in).  Levenshtein is O(len²) per pair — the reason real
    pipelines LSH FIRST and verify only candidates."""
    base = (
        _docs(spark, sf_dir)
        .where((F.col("doc_id") % 20 == 0) & (F.trim("text") != ""))
        .select("doc_id", F.col("text").alias("a"))
    )
    variants = base.select(
        "doc_id",
        F.explode(
            F.map_from_arrays(
                F.array(
                    F.lit("append"), F.lit("sub"), F.lit("half"),
                    F.lit("rev"),
                ),
                F.array(
                    F.concat(F.col("a"), F.lit(" extra!")),
                    F.regexp_replace("a", "a", "b"),
                    F.substring(
                        F.col("a"), 1, (F.length("a") / 2).cast("int")
                    ),
                    F.reverse(F.col("a")),
                ),
            )
        ).alias("variant", "b"),
        "a",
    )
    d = F.levenshtein("a", "b").cast("long")
    maxlen = F.greatest(F.length("a"), F.length("b")).cast("long")
    return variants.select(
        "doc_id",
        "variant",
        d.alias("d"),
        F.length("a").cast("long").alias("len_a"),
        F.length("b").cast("long").alias("len_b"),
        F.expr(
            "CAST(((greatest(length(a), length(b)) - levenshtein(a, b))"
            " * 100000) DIV greatest(length(a), length(b)) AS BIGINT)"
        ).alias("sim_e5"),
    )


def q_bleu_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BLEU-2 overlap scoring over the near-dup candidate pairs — the
    MT metric reused the way data pipelines actually use it: as a
    sequence-overlap verifier for dedup candidates and a
    decontamination score against eval references (clipped n-gram
    precision is exactly the "how much of the candidate is copied"
    question).  For each (reference a, candidate b) pair: clipped
    unigram and bigram precision numerators/denominators (exact
    BIGINTs — Σ over distinct candidate grams of min(count_b,
    count_a)), both token lengths, and the smoothed log-BLEU
    ½·ln p1 + ½·ln p2 + min(0, 1 − r/c) e3-floored (the brevity
    penalty in log space — no exp anywhere), with the zero-overlap
    sentinel −99000.

    Candidate pairs are the `edit_verify` variant pool (doc_id % 20
    == 0): `same` (logbleu exactly 0 — the anchor), `append`, `sub`
    (every 'a'→'b'), `half`.  Cross-engine: counts are pure BIGINT
    array folds; the final score is ONE identical expression text of
    floor/ln/least on exact integer operands (the source_kl floored-ln
    discipline).

    Scale shape: pure per-row array math over the candidate pairs —
    zero exchanges past the pair build; at 100 TB the pairs come from
    the LSH band join and this expression drops in as the verifier."""
    base = (
        _docs(spark, sf_dir)
        .where((F.col("doc_id") % 20 == 0) & (F.trim("text") != ""))
        .select("doc_id", F.col("text").alias("a"))
    )
    variants = base.select(
        "doc_id",
        F.explode(
            F.map_from_arrays(
                F.array(
                    F.lit("same"), F.lit("append"), F.lit("sub"),
                    F.lit("half"),
                ),
                F.array(
                    F.col("a"),
                    F.concat(F.col("a"), F.lit(" extra!")),
                    F.regexp_replace("a", "a", "b"),
                    F.substring(
                        F.col("a"), 1, (F.length("a") / 2).cast("int")
                    ),
                ),
            )
        ).alias("variant", "b"),
        "a",
    )
    ws = "[ \\t\\n\\x0B\\f\\r]+"
    t = variants.select(
        "doc_id",
        "variant",
        F.split(F.trim(F.col("a")), ws).alias("ta"),
        F.split(F.trim(F.col("b")), ws).alias("tb"),
    )

    def bigrams(arr: str) -> str:
        return (
            f"CASE WHEN size({arr}) >= 2 THEN"
            f" transform(sequence(1, size({arr}) - 1),"
            f" i -> concat(element_at({arr}, i), ' ',"
            f" element_at({arr}, i + 1)))"
            " ELSE CAST(array() AS array<string>) END"
        )

    def clipped(cand: str, ref: str) -> str:
        return (
            f"aggregate(array_distinct({cand}), CAST(0 AS BIGINT),"
            f" (acc, w) -> acc + least(size(filter({cand}, x -> x = w)),"
            f" size(filter({ref}, x -> x = w))))"
        )

    g = t.withColumn("ba", F.expr(bigrams("ta"))).withColumn(
        "bb", F.expr(bigrams("tb"))
    )
    c = g.select(
        "doc_id",
        "variant",
        F.expr(clipped("tb", "ta")).alias("p1_num"),
        F.expr("CAST(size(tb) AS BIGINT)").alias("p1_den"),
        F.expr(clipped("bb", "ba")).alias("p2_num"),
        F.expr("CAST(size(bb) AS BIGINT)").alias("p2_den"),
        F.expr("CAST(size(ta) AS BIGINT)").alias("r_len"),
        F.expr("CAST(size(tb) AS BIGINT)").alias("c_len"),
    )
    return c.select(
        "doc_id",
        "variant",
        "p1_num",
        "p1_den",
        "p2_num",
        "p2_den",
        "r_len",
        "c_len",
        F.expr(_BLEU_SCORE_EXPR).alias("logbleu_e3"),
    )


# The one-expression log-BLEU — IDENTICAL text spliced into BOTH
# engines (the kn_bigram_score one-expression-float rule): floored ln
# on exact integer ratios, brevity penalty in log space via least().
_BLEU_SCORE_EXPR = (
    "CASE WHEN p1_num = 0 OR p2_num = 0 THEN -99000"
    " ELSE CAST(floor((0.5 * ln(CAST(p1_num AS DOUBLE)"
    " / CAST(p1_den AS DOUBLE))"
    " + 0.5 * ln(CAST(p2_num AS DOUBLE) / CAST(p2_den AS DOUBLE))"
    " + least(0.0, 1.0 - CAST(r_len AS DOUBLE) / CAST(c_len AS DOUBLE)))"
    " * 1000) AS BIGINT) END"
)


def _bleu_pairs_sql() -> str:
    """bleu_pairs oracle: identical variant pool, identical clipped-
    count folds (list_* lambdas), the SAME spliced score expression."""
    ws = "[ \\t\\n\\x0B\\f\\r]+"

    def clipped(cand: str, ref: str) -> str:
        return (
            f"CAST(coalesce(list_sum(list_transform(list_distinct({cand}),"
            f" w -> least(len(list_filter({cand}, x -> x = w)),"
            f" len(list_filter({ref}, x -> x = w))))), 0) AS BIGINT)"
        )

    return f"""
WITH base AS (
  SELECT doc_id, text AS a FROM documents
  WHERE doc_id % 20 = 0 AND trim(text) <> ''
), v AS (
  SELECT doc_id, 'same' AS variant, a, a AS b FROM base
  UNION ALL
  SELECT doc_id, 'append', a, a || ' extra!' FROM base
  UNION ALL
  SELECT doc_id, 'sub', a, regexp_replace(a, 'a', 'b', 'g') FROM base
  UNION ALL
  SELECT doc_id, 'half', a, substring(a, 1, length(a) // 2) FROM base
), tt AS (
  SELECT doc_id, variant,
         regexp_split_to_array(trim(a), '{ws}') AS ta,
         regexp_split_to_array(trim(b), '{ws}') AS tb
  FROM v
), bg AS (
  SELECT doc_id, variant, ta, tb,
         list_transform(generate_series(1, len(ta) - 1),
                        i -> ta[i] || ' ' || ta[i+1]) AS ba,
         list_transform(generate_series(1, len(tb) - 1),
                        i -> tb[i] || ' ' || tb[i+1]) AS bb
  FROM tt
), c AS (
  SELECT doc_id, variant,
    {clipped("tb", "ta")} AS p1_num,
    CAST(len(tb) AS BIGINT) AS p1_den,
    {clipped("bb", "ba")} AS p2_num,
    CAST(len(bb) AS BIGINT) AS p2_den,
    CAST(len(ta) AS BIGINT) AS r_len,
    CAST(len(tb) AS BIGINT) AS c_len
  FROM bg
)
SELECT doc_id, variant, p1_num, p1_den, p2_num, p2_den, r_len, c_len,
       {_BLEU_SCORE_EXPR} AS logbleu_e3
FROM c
"""


# ROUGE-L spec — MIRRORED in `_rouge_pairs_sql`; change together.
# Same variant pool as bleu_pairs/edit_verify; both sides TRUNCATE to
# the first ROUGE_MAX_TOK tokens (the O(cap²) DP bound — eval-harness
# convention), and the LCS is the identical nested fold: Spark
# aggregate-in-aggregate ↔ DuckDB list_reduce with the seed PREPENDED
# and indices as BIGINT singletons (list_reduce demands state type ==
# element type — the reason for the [i] encoding).
ROUGE_MAX_TOK = 64


def q_rouge_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROUGE-L overlap scoring over the near-dup candidate pairs (Lin
    2004) — the recall-side companion of `bleu_pairs` on the SAME
    variant pool: BLEU's clipped n-grams measure copied PHRASES,
    ROUGE-L's longest common subsequence measures preserved ORDER
    (a shuffled copy keeps BLEU-1 high but collapses LCS), so the
    two together separate rewording from reordering — the verifier
    pair a dedup reviewer actually wants.  Per (doc, variant):
    capped token lengths, the exact LCS, and integer-rational
    recall/precision/F1 — r = l/|a|, p = l/|b|, f = 2l/(|a|+|b|).

    Cross-engine: the LCS is a classic one-row DP run as a NESTED
    fold — outer over a's tokens carrying the DP row, inner over b's
    positions building the next row with new[j] = max(old[j],
    new[j-1], old[j-1] + [a_i = b_j]) — all BIGINT, no floats
    anywhere; the e6 ratios are truncating DIVs on non-negatives.
    `same` → f = 1e6 exactly (the anchor); pytest proves the fold
    against a textbook Python DP.

    Scale shape: pure per-row array math over the bounded candidate
    pairs — zero exchanges past the pair build; the O(cap²) DP cost
    is bounded by ROUGE_MAX_TOK, never by document length."""
    base = (
        _docs(spark, sf_dir)
        .where((F.col("doc_id") % 20 == 0) & (F.trim("text") != ""))
        .select("doc_id", F.col("text").alias("a"))
    )
    variants = base.select(
        "doc_id",
        F.explode(
            F.map_from_arrays(
                F.array(
                    F.lit("same"), F.lit("append"), F.lit("sub"),
                    F.lit("half"),
                ),
                F.array(
                    F.col("a"),
                    F.concat(F.col("a"), F.lit(" extra!")),
                    F.regexp_replace("a", "a", "b"),
                    F.substring(
                        F.col("a"), 1, (F.length("a") / 2).cast("int")
                    ),
                ),
            )
        ).alias("variant", "b"),
        "a",
    )
    ws = "[ \\t\\n\\x0B\\f\\r]+"
    cap = ROUGE_MAX_TOK
    t = variants.select(
        "doc_id",
        "variant",
        F.slice(F.split(F.trim(F.col("a")), ws), 1, cap).alias("ta"),
        F.slice(F.split(F.trim(F.col("b")), ws), 1, cap).alias("tb"),
    )
    lcs = F.expr(
        "element_at(aggregate("
        " sequence(1, size(ta)),"
        " transform(sequence(0, size(tb)), x -> CAST(0 AS BIGINT)),"
        " (old, i) -> aggregate("
        "   sequence(1, size(tb)),"
        "   array(CAST(0 AS BIGINT)),"
        "   (nr, j) -> concat(nr, array(greatest("
        "     element_at(old, j + 1),"
        "     element_at(nr, -1),"
        "     CASE WHEN element_at(tb, j) = element_at(ta, i)"
        "          THEN element_at(old, j) + 1"
        "          ELSE CAST(0 AS BIGINT) END)))"
        " )), size(tb) + 1)"
    )
    return t.select(
        "doc_id",
        "variant",
        F.size("ta").cast("long").alias("len_a"),
        F.size("tb").cast("long").alias("len_b"),
        lcs.alias("lcs"),
    ).selectExpr(
        "doc_id",
        "variant",
        "len_a",
        "len_b",
        "lcs",
        "(lcs * 1000000) DIV len_a AS rouge_r_e6",
        "(lcs * 1000000) DIV len_b AS rouge_p_e6",
        "(2 * lcs * 1000000) DIV (len_a + len_b) AS rouge_f_e6",
    )


def _rouge_pairs_sql(cap: int | None = None) -> str:
    """rouge_pairs oracle: identical variant pool and caps, the LCS
    as list_reduce-in-list_reduce (seed prepended, [i] index
    singletons), identical DIV ratios."""
    cap = ROUGE_MAX_TOK if cap is None else cap
    ws = "[ \\t\\n\\x0B\\f\\r]+"
    lcs = """list_reduce(
  list_prepend(list_transform(generate_series(0, len(tb)),
                              x -> CAST(0 AS BIGINT)),
               list_transform(generate_series(1, len(ta)),
                              i -> [CAST(i AS BIGINT)])),
  (old, el) -> list_reduce(
     list_prepend(CAST([0] AS BIGINT[]),
                  list_transform(generate_series(1, len(tb)),
                                 j -> [CAST(j AS BIGINT)])),
     (nr, jel) -> list_append(nr, greatest(
        old[jel[1] + 1], nr[len(nr)],
        CASE WHEN tb[jel[1]] = ta[el[1]] THEN old[jel[1]] + 1
             ELSE CAST(0 AS BIGINT) END))
  )
)[len(tb) + 1]"""
    return f"""
WITH base AS (
  SELECT doc_id, text AS a FROM documents
  WHERE doc_id % 20 = 0 AND trim(text) <> ''
), v AS (
  SELECT doc_id, 'same' AS variant, a, a AS b FROM base
  UNION ALL
  SELECT doc_id, 'append', a, a || ' extra!' FROM base
  UNION ALL
  SELECT doc_id, 'sub', a, regexp_replace(a, 'a', 'b', 'g') FROM base
  UNION ALL
  SELECT doc_id, 'half', a, substring(a, 1, length(a) // 2) FROM base
), t AS (
  SELECT doc_id, variant,
         regexp_split_to_array(trim(a), '{ws}')[1:{cap}] AS ta,
         regexp_split_to_array(trim(b), '{ws}')[1:{cap}] AS tb
  FROM v
), sc AS (
  SELECT doc_id, variant,
         CAST(len(ta) AS BIGINT) AS len_a,
         CAST(len(tb) AS BIGINT) AS len_b,
         CAST({lcs} AS BIGINT) AS lcs
  FROM t
)
SELECT doc_id, variant, len_a, len_b, lcs,
       CAST((lcs * 1000000) // len_a AS BIGINT) AS rouge_r_e6,
       CAST((lcs * 1000000) // len_b AS BIGINT) AS rouge_p_e6,
       CAST((2 * lcs * 1000000) // (len_a + len_b) AS BIGINT)
         AS rouge_f_e6
FROM sc
"""


def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word-3-gram Jaccard on the injected dup pairs — pure JVM array
    math (split/transform/array_intersect/array_union), SQL-mirrored.
    Validates the Jaccard computation itself; the LSH pipeline applies
    it at scale over candidate pairs only."""

    def shingles(col):
        words = F.split(F.lower(F.trim(col)), "[ \\t\\n\\x0B\\f\\r]+")
        n = F.size(words)
        return F.when(
            n >= 3,
            F.transform(
                F.sequence(F.lit(1), n - 2),
                lambda i: F.concat_ws(" ", F.slice(words, i, 3)),
            ),
        ).otherwise(F.array(F.concat_ws(" ", words)))

    base = _docs(spark, sf_dir).where(F.col("doc_id") % 20 == 0).select(
        "doc_id", F.col("text").alias("text_a")
    )
    near = base.select(
        "doc_id",
        F.col("text_a"),
        F.concat(F.col("text_a"), F.lit(" extra!")).alias("text_b"),
    )
    sa, sb = shingles(F.col("text_a")), shingles(F.col("text_b"))
    inter = F.size(F.array_intersect(sa, sb)).cast("double")
    union = F.size(F.array_union(sa, sb)).cast("double")
    return near.select(
        "doc_id",
        F.round(inter / union, 5).alias("jaccard_near"),
    )


def q_embedding_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    from rxtls_spark.operators.embedding_dedup import (
        embedding_dup_pairs,
        with_injected_embedding_dups,
    )

    return embedding_dup_pairs(
        with_injected_embedding_dups(_emb(spark, sf_dir)), threshold=0.8
    )


def q_embedding_dups_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Injected-copy recovery through the hyperplane-LSH path: an exact
    copy has identical buckets in every table, so every (v, v+1e6) pair
    must be recovered; sim_e5 recomputed directly on the pair so both
    engines evaluate the same float fold."""
    from rxtls_spark.operators.embedding_dedup import (
        embedding_dup_pairs_lsh,
        with_injected_embedding_dups,
    )
    from rxtls_spark.operators.similarity import cosine_expr

    emb = _emb(spark, sf_dir)
    lsh = embedding_dup_pairs_lsh(
        with_injected_embedding_dups(emb), threshold=0.8
    ).select("vec_a", "vec_b", F.lit(1).alias("hit"))
    expected = emb.where(F.col("vec_id") % 25 == 0).select(
        F.col("vec_id").alias("vec_a"),
        (F.col("vec_id") + F.lit(1_000_000)).alias("vec_b"),
        F.col("embedding").alias("emb_a"),
        F.col("embedding").alias("emb_b"),
    )
    return (
        expected.withColumn(
            "sim_e5", F.floor(cosine_expr("emb_a", "emb_b") * 100000).cast("long")
        )
        .join(lsh, ["vec_a", "vec_b"], "left")
        .select(
            "vec_a",
            "vec_b",
            "sim_e5",
            F.coalesce(F.col("hit"), F.lit(0)).cast("long").alias("recovered"),
        )
    )


# SemDeDup threshold — baked into BOTH the Spark filter (as the e5
# integer) and the SQL oracle (as the raw float); change together.
SEMDEDUP_TAU = 0.8
SEMDEDUP_TAU_E5 = 80000


def q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540) — semantic
    near-duplicate pruning via cluster-then-compare: k-means the
    embedding space, then compute pairwise cosine ONLY within each
    cluster and drop every vector that has a lower-id near-duplicate
    (deterministic min-id keep rule) in its cell.  Output is one row
    per dropped vector: (vec_id, cell, keeper=min dup partner, sim_e5
    to that keeper).

    Composition of proven pieces: the quantizer is the SAME
    deterministic Lloyd's as `kmeans` (knuth seed, L2 argmin with
    lowest-cell tie-break, 6-dp means — the oracle reuses those CTEs
    verbatim), assignment is the per-row JVM argmin of `ann_ivf_topk`,
    and the pair verify is the exact-cosine fold of `dedup_embedding`.
    Injected copies (vec_id+10^6, identical embedding) land in the same
    cell by construction, so the dropped set is deterministic and
    non-empty.

    Scale shape (the SemDeDup design point): NO corpus-wide pair join —
    candidates come from an equi-join on `cell`, and k grows with the
    corpus (the paper uses k ≈ N/5000) so per-cell pair work stays
    bounded; skewed cells would take the same capped-bucket guard as
    `dedup.py:_cap_buckets`.  Training is metadata-scale (k-row agg
    per iteration); assignment is a pure per-row map."""
    from rxtls_spark.operators.embedding_dedup import (
        with_injected_embedding_dups,
    )
    from rxtls_spark.operators.similarity import (
        cosine_expr,
        ivf_assign_expr,
        train_ivf_centroids,
    )

    emb = _emb(spark, sf_dir)
    cents = train_ivf_centroids(
        emb,
        k=KMEANS_K,
        iters=KMEANS_ITERS,
        metric="l2",
        seed_order=knuth_hash(F.col("vec_id")),
        round_dp=6,
    )
    uni = with_injected_embedding_dups(emb)
    asg = uni.select(
        "vec_id",
        "embedding",
        ivf_assign_expr(cents, F.col("embedding"), metric="l2").alias("cell"),
    ).localCheckpoint(eager=False)  # assign once for both join sides
    a = asg.select(
        F.col("vec_id").alias("keeper"),
        F.col("embedding").alias("emb_a"),
        "cell",
    )
    b = asg.select(
        "vec_id", F.col("embedding").alias("emb_b"), "cell"
    )
    pairs = (
        a.join(b, "cell")
        .where(F.col("keeper") < F.col("vec_id"))
        .withColumn(
            "sim_e5",
            F.floor(cosine_expr("emb_a", "emb_b") * 100000).cast("long"),
        )
        .where(F.col("sim_e5") >= SEMDEDUP_TAU_E5)
    )
    return pairs.groupBy("vec_id").agg(
        F.min("cell").cast("long").alias("cell"),
        F.min("keeper").alias("keeper"),
        F.min_by("sim_e5", "keeper").alias("sim_e5"),
    )


# SSL-prototypes pruning constants — MIRRORED in `_proto_prune_sql`;
# change together.  Each cluster drops its floor(n_cell * NUM / DEN)
# most-prototypical vectors; the cut count is decided in pure BIGINT.
PROTO_PRUNE_NUM = 1
PROTO_PRUNE_DEN = 4


def q_proto_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SSL-prototypes data pruning (Sorscher et al. 2022, "Beyond
    neural scaling laws", arXiv:2206.14486): cluster the embedding
    space, score each vector by cosine similarity to its own cluster
    centroid (prototypicality), and prune the MOST prototypical
    fraction per cluster — on large corpora the easy/redundant
    examples near cluster centers contribute least to training, so
    dropping them beats random pruning.  Output is one row per vector:
    (vec_id, cell, proto_e5, rnk, kept) with kept=0 for the pruned
    top floor(n_cell * NUM/DEN) of each cell.

    Composition of proven pieces: the quantizer is the SAME
    deterministic Lloyd's as `kmeans` / `semantic_dedup` (knuth seed,
    L2 argmin with lowest-cell tie-break, 6-dp means — the oracle
    reuses those CTEs verbatim); the prototypicality score is the
    e5-floored cosine fold of the ANN family; the per-cluster cut is
    a window rank with (score desc, vec_id) tie-break and an
    all-BIGINT threshold, so both engines make identical decisions.

    Scale shape: training is metadata-scale (k-row agg per
    iteration); assignment + scoring is a pure per-row map against
    literal centroids (no join); the only corpus exchange is the ONE
    hash-partition on `cell` for the within-cluster rank — never a
    global sort, and cells stay bounded because k grows with the
    corpus (the SemDeDup sizing argument)."""
    from pyspark.sql.window import Window

    from rxtls_spark.operators.similarity import (
        _cents_lit,
        _cosine_cols,
        ivf_assign_expr,
        train_ivf_centroids,
    )

    emb = _emb(spark, sf_dir)
    cents = train_ivf_centroids(
        emb,
        k=KMEANS_K,
        iters=KMEANS_ITERS,
        metric="l2",
        seed_order=knuth_hash(F.col("vec_id")),
        round_dp=6,
    )
    asg = emb.select(
        "vec_id",
        "embedding",
        ivf_assign_expr(cents, F.col("embedding"), metric="l2").alias("cell"),
    )
    sim_structs = F.transform(
        _cents_lit(cents),
        lambda c: F.struct(
            c["cell"].alias("cell"),
            _cosine_cols(F.col("embedding"), c["centroid"]).alias("sim"),
        ),
    )
    own = F.element_at(
        F.filter(sim_structs, lambda s: s["cell"] == F.col("cell")), 1
    )
    scored = asg.select(
        "vec_id",
        F.col("cell").cast("long").alias("cell"),
        F.floor(own["sim"] * 100000).cast("long").alias("proto_e5"),
    )
    w = Window.partitionBy("cell").orderBy(F.col("proto_e5").desc(), "vec_id")
    cw = Window.partitionBy("cell")
    ranked = scored.select(
        "*",
        F.row_number().over(w).cast("long").alias("rnk"),
        F.count(F.lit(1)).over(cw).cast("long").alias("n_cell"),
    )
    prune_k = F.expr(
        f"CAST((n_cell * {PROTO_PRUNE_NUM}) DIV {PROTO_PRUNE_DEN} AS BIGINT)"
    )
    return ranked.select(
        "vec_id",
        "cell",
        "proto_e5",
        "rnk",
        (F.col("rnk") > prune_k).cast("long").alias("kept"),
    )


def q_d4_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D4 two-stage pruning (Tirumala et al. 2023, "D4: Improving LLM
    Pretraining via Document De-Duplication and Diversification",
    arXiv:2308.12284): SemDeDup first (drop semantic near-duplicates),
    then SSL-prototypes pruning over the SURVIVORS — dedup removes the
    redundant copies, diversification then removes the most
    prototypical fraction of what remains.  One row per vector in the
    (base + injected-copy) union: verdict 'semdedup' (stage-1 drop,
    null proto/rank), 'proto' (stage-2 drop) or 'kept', with kept=1
    only for final survivors.

    Deviation from the paper, documented: the paper re-embeds and
    re-clusters between stages; this operator keeps the stage-1
    quantizer FROZEN for stage 2 (the streaming-ANN train-once
    contract) so the composition is deterministic and the oracle can
    reuse the shared unrolled-Lloyd's CTEs.  Constants are shared with
    the component operators — `SEMDEDUP_TAU(_E5)` and
    `PROTO_PRUNE_NUM/DEN` (mirrored in `_d4_prune_sql`; the kmeans
    spec constants flow in via `_kmeans_cents_ctes`).  Unlike
    `semantic_dedup`, BOTH engines gate pairs on the e5-floored cosine
    (`sim_e5 >= SEMDEDUP_TAU_E5`) so the comparison form is identical
    cross-engine.

    Scale shape: the union of the component shapes — metadata-scale
    training, per-row JVM cell assign, within-cell pair join for
    stage 1 (the SemDeDup k≈N/5000 sizing bounds cells), ONE
    hash-partition on `cell` for the stage-2 rank.  No corpus-wide
    pair join, no global sort."""
    from pyspark.sql.window import Window

    from rxtls_spark.operators.embedding_dedup import (
        with_injected_embedding_dups,
    )
    from rxtls_spark.operators.similarity import (
        _cents_lit,
        _cosine_cols,
        cosine_expr,
        ivf_assign_expr,
        train_ivf_centroids,
    )

    emb = _emb(spark, sf_dir)
    cents = train_ivf_centroids(
        emb,
        k=KMEANS_K,
        iters=KMEANS_ITERS,
        metric="l2",
        seed_order=knuth_hash(F.col("vec_id")),
        round_dp=6,
    )
    uni = with_injected_embedding_dups(emb)
    asg = uni.select(
        "vec_id",
        "embedding",
        ivf_assign_expr(cents, F.col("embedding"), metric="l2").alias("cell"),
    ).localCheckpoint(eager=False)  # assign once: pair join + both stages
    a = asg.select(
        F.col("vec_id").alias("keeper"),
        F.col("embedding").alias("emb_a"),
        "cell",
    )
    b = asg.select("vec_id", F.col("embedding").alias("emb_b"), "cell")
    dropped = (
        a.join(b, "cell")
        .where(F.col("keeper") < F.col("vec_id"))
        .where(
            F.floor(cosine_expr("emb_a", "emb_b") * 100000).cast("long")
            >= SEMDEDUP_TAU_E5
        )
        .select("vec_id")
        .distinct()
    )
    sem_rows = asg.join(dropped, "vec_id", "left_semi").select(
        "vec_id",
        F.col("cell").cast("long").alias("cell"),
        F.lit("semdedup").alias("verdict"),
        F.lit(None).cast("long").alias("proto_e5"),
        F.lit(None).cast("long").alias("rnk"),
        F.lit(0).cast("long").alias("kept"),
    )
    surv = asg.join(dropped, "vec_id", "left_anti")
    sim_structs = F.transform(
        _cents_lit(cents),
        lambda c: F.struct(
            c["cell"].alias("cell"),
            _cosine_cols(F.col("embedding"), c["centroid"]).alias("sim"),
        ),
    )
    own = F.element_at(
        F.filter(sim_structs, lambda s: s["cell"] == F.col("cell")), 1
    )
    scored = surv.select(
        "vec_id",
        F.col("cell").cast("long").alias("cell"),
        F.floor(own["sim"] * 100000).cast("long").alias("proto_e5"),
    )
    w = Window.partitionBy("cell").orderBy(F.col("proto_e5").desc(), "vec_id")
    cw = Window.partitionBy("cell")
    ranked = scored.select(
        "*",
        F.row_number().over(w).cast("long").alias("rnk"),
        F.count(F.lit(1)).over(cw).cast("long").alias("n_cell"),
    )
    prune_k = F.expr(
        f"CAST((n_cell * {PROTO_PRUNE_NUM}) DIV {PROTO_PRUNE_DEN} AS BIGINT)"
    )
    proto_rows = ranked.select(
        "vec_id",
        "cell",
        F.when(F.col("rnk") <= prune_k, F.lit("proto"))
        .otherwise(F.lit("kept"))
        .alias("verdict"),
        "proto_e5",
        "rnk",
        (F.col("rnk") > prune_k).cast("long").alias("kept"),
    )
    return sem_rows.unionByName(proto_rows)


# MMR diverse-selection constants — MIRRORED in `_mmr_select_sql`;
# change together.  λ = LAM_NUM/LAM_DEN; every selection gates on
# e5-floored BIGINT cosines so both engines pick identical rows, and
# the diversity penalty is clamped at 0 (greatest(0, max cos to the
# selected set)) on BOTH sides — the SQL accumulates it incrementally
# from a 0 seed, so an unclamped negative penalty would diverge.
MMR_K = 8
MMR_LAM_NUM = 7
MMR_LAM_DEN = 10


def q_mmr_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal-Marginal-Relevance diverse top-k selection (Carbonell &
    Goldstein 1998, SIGIR — the standard diversity-aware selection
    used in data curation and retrieval): greedily pick ``MMR_K``
    vectors maximizing ``λ·rel − (1−λ)·max_sim_to_selected`` where
    rel is cosine to a deterministic query vector (the lowest-vec_id
    embedding) and the penalty is the max cosine to the already-picked
    set, clamped at 0.  Every comparison is on e5-floored BIGINT
    cosines with a vec_id tie-break, so the greedy trajectory is
    exact cross-engine; the oracle unrolls the K iterations as a CTE
    chain (the `kmeans` unrolled-loop pattern).  Emits one row per
    pick: (rnk, vec_id, rel_e5, pen_e5, score_e5).

    Scale shape: the relevance pass is ONE pure map scored against a
    literal query vector (computed once, localCheckpoint), then each
    of the K iterations is a pure map (cosine folds against ≤K-1
    literal selected vectors — metadata, folded into the plan) plus a
    TakeOrderedAndProject(1) — no join, no window, no corpus shuffle.
    At 100 TB you would pre-filter to a top-M relevance pool first
    (`brute_force_topk` / `ann_ivf_topk`) and run the K passes over
    the pool; K and the selected set stay driver-side metadata either
    way."""
    from rxtls_spark.operators.similarity import _cosine_cols

    emb = _emb(spark, sf_dir)
    q_row = emb.orderBy("vec_id").select("vec_id", "embedding").first()
    q_id = int(q_row["vec_id"])
    q_lit = F.array(*[F.lit(float(x)) for x in q_row["embedding"]])
    cand = (
        emb.where(F.col("vec_id") != q_id)
        .select(
            "vec_id",
            "embedding",
            F.floor(_cosine_cols(F.col("embedding"), q_lit) * 100000)
            .cast("long")
            .alias("rel_e5"),
        )
        .localCheckpoint(eager=False)  # score rel once; K argmax passes
    )
    pen_w = MMR_LAM_DEN - MMR_LAM_NUM
    picked: list[tuple] = []  # (rnk, vec_id, rel_e5, pen_e5, score_e5)
    picked_vecs: list = []  # literal arrays of selected embeddings
    for rnk in range(1, MMR_K + 1):
        pen = F.greatest(
            F.lit(0).cast("long"),
            *[
                F.floor(_cosine_cols(F.col("embedding"), v) * 100000).cast(
                    "long"
                )
                for v in picked_vecs
            ],
        ) if picked_vecs else F.lit(0).cast("long")
        pool = (
            cand.where(~F.col("vec_id").isin([p[1] for p in picked]))
            if picked
            else cand
        )
        row = (
            pool.select("vec_id", "embedding", "rel_e5", pen.alias("pen_e5"))
            .withColumn(
                "score_e5",
                F.lit(MMR_LAM_NUM) * F.col("rel_e5")
                - F.lit(pen_w) * F.col("pen_e5"),
            )
            .orderBy(F.col("score_e5").desc(), "vec_id")
            .first()  # TakeOrderedAndProject(1): metadata-scale
        )
        picked.append(
            (
                rnk,
                int(row["vec_id"]),
                int(row["rel_e5"]),
                int(row["pen_e5"]),
                int(row["score_e5"]),
            )
        )
        picked_vecs.append(
            F.array(*[F.lit(float(x)) for x in row["embedding"]])
        )
    return spark.createDataFrame(
        picked,
        "rnk long, vec_id long, rel_e5 long, pen_e5 long, score_e5 long",
    )


# Span-dedup constants — W mirrored in the oracle SQL; change together.
SPAN_W = 10
SPAN_DUP_OFFSET = 1_000_000_000


def q_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style cross-document span deduplication (Raffel et al. 2020
    §2.2 dedup three-sentence spans; here fixed ``SPAN_W``-word spans
    since the corpus is flat word streams): every occurrence of a span
    after its global first occurrence (ordered by doc_id, span idx) is
    removed, and each document is re-assembled from its surviving
    spans.  Emits per doc: n_spans, n_kept, md5 of the re-assembled
    text (null when the whole doc was consumed by earlier documents).
    Injected full copies (doc_id+10^9 for doc_id%20==0, the
    dedup_minhash convention) deterministically lose every span.

    Scale shape: tokenize + span-split is a pure map (the doc_chunks
    transform/sequence/slice pattern, no UDF); first-occurrence is ONE
    hash-partitioned window over span text (partition = identical
    span — never a global sort; a pathologically hot span would take
    the dedup.py bucket-cap guard); re-assembly is one per-doc hash
    agg with an in-group array_sort — 2 exchanges total, both on keys
    that scale with the corpus."""
    from pyspark.sql.window import Window

    docs = (
        _docs(spark, sf_dir)
        .select("doc_id", "text")
        .where(F.trim("text") != "")
    )
    uni = docs.unionByName(
        docs.where(F.col("doc_id") % 20 == 0).select(
            (F.col("doc_id") + F.lit(SPAN_DUP_OFFSET)).alias("doc_id"),
            "text",
        )
    )
    t = uni.select("doc_id", _lm_tokens().alias("t"))
    n = F.size("t")
    spans = F.transform(
        F.sequence(F.lit(0), F.ceil(n / F.lit(SPAN_W)).cast("int") - 1),
        lambda i: F.concat_ws(
            " ", F.slice(F.col("t"), i * SPAN_W + 1, SPAN_W)
        ),
    )
    ex = t.where(n > 0).select(
        "doc_id", F.posexplode(spans).alias("idx", "span")
    )
    w = Window.partitionBy("span").orderBy("doc_id", "idx")
    flagged = ex.withColumn(
        "kept", (F.row_number().over(w) == 1).cast("int")
    )
    kept_structs = F.array_sort(
        F.collect_list(F.when(F.col("kept") == 1, F.struct("idx", "span")))
    )
    out = flagged.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_spans"),
        F.sum("kept").cast("long").alias("n_kept"),
        F.array_join(
            F.transform(kept_structs, lambda s: s["span"]), " "
        ).alias("kept_text"),
    )
    return out.select(
        "doc_id",
        "n_spans",
        "n_kept",
        F.when(F.col("n_kept") > 0, F.md5("kept_text")).alias("kept_md5"),
    )


# ExactSubstr k-gram length + half-copy injection offset — MIRRORED in
# the `exact_substr` oracle SQL; change together.
EXSUB_K = 8
EXSUB_HALF_OFFSET = 2_000_000_000


def q_exact_substr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ExactSubstr-style duplicated-text measurement (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better",
    arXiv:2107.06499 §4.1): the paper marks any substring of >= 50 BPE
    tokens that appears verbatim elsewhere in the corpus (via a suffix
    array); here the equivalent SLIDING word ``EXSUB_K``-gram test —
    a token position is duplicated iff some k-gram covering it occurs
    at >= 2 distinct (doc, pos) sites corpus-wide.  (Overlapping
    windows at stride 1 detect exactly the >= K-token shared
    substrings a suffix array would, quantized to word boundaries —
    the Spark-native replacement for the paper's sequential suffix
    automaton.)  Unlike `span_dedup` (non-overlapping spans, global
    first-occurrence REWRITE), this marks ALL occurrences and reports
    per-doc duplicated-token coverage via exact integer interval
    union.  Injected duplicates exercise both shapes: full copies
    (doc_id+SPAN_DUP_OFFSET for doc_id%20==0 — original becomes 100%
    covered) and FIRST-HALF copies (doc_id+EXSUB_HALF_OFFSET for
    doc_id%16==3 — original is covered only on its first (n+1) DIV 2
    tokens minus the k-gram boundary effect).

    Output per doc in the union: n_tokens, n_grams, n_dup_grams, and
    n_dup_tokens (the interval-union length — first sorted dup start
    contributes K, each later start p after previous q contributes
    min(K, p-q)).  Everything is BIGINT; no float leaves an engine.

    Scale shape: tokenize + gram-split is a pure map (no UDF); the
    duplicate test is ONE hash partition on the gram string (count
    over partition — never a global sort; a pathologically hot gram
    takes the dedup.py bucket-cap guard, same note as `span_dedup`);
    coverage is one per-doc hash agg whose fold runs inside the group.
    3 exchanges total, all on keys that scale with the corpus."""
    from pyspark.sql.window import Window

    k = EXSUB_K
    docs = (
        _docs(spark, sf_dir)
        .select("doc_id", "text")
        .where(F.trim("text") != "")
    )
    toks = _lm_tokens()
    half_len = ((F.size(toks) + F.lit(1)) / F.lit(2)).cast("int")
    half = F.concat_ws(" ", F.slice(toks, F.lit(1), half_len))
    uni = (
        docs.unionByName(
            docs.where(F.col("doc_id") % 20 == 0).select(
                (F.col("doc_id") + F.lit(SPAN_DUP_OFFSET)).alias("doc_id"),
                "text",
            )
        )
        .unionByName(
            docs.where(F.col("doc_id") % 16 == 3).select(
                (F.col("doc_id") + F.lit(EXSUB_HALF_OFFSET)).alias("doc_id"),
                half.alias("text"),
            )
        )
    )
    t = uni.select("doc_id", _lm_tokens().alias("t"))
    n = F.size("t")
    grams = F.transform(
        F.sequence(F.lit(0), n - k),
        lambda i: F.concat_ws(" ", F.slice(F.col("t"), i + 1, k)),
    )
    base = t.select("doc_id", n.cast("long").alias("n_tokens"))
    ex = t.where(n >= k).select(
        "doc_id", F.posexplode(grams).alias("pos", "gram")
    )
    wg = Window.partitionBy("gram")
    dup = ex.withColumn("n_occ", F.count(F.lit(1)).over(wg))
    per_doc = dup.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_grams"),
        F.sum((F.col("n_occ") >= 2).cast("long"))
        .cast("long")
        .alias("n_dup_grams"),
        F.sort_array(
            F.collect_list(F.when(F.col("n_occ") >= 2, F.col("pos")))
        ).alias("dup_pos"),
    )
    covered = F.aggregate(
        F.col("dup_pos"),
        F.struct(
            F.lit(0).cast("long").alias("cov"),
            F.lit(-(k + 1)).cast("long").alias("prev"),
        ),
        lambda acc, p: F.struct(
            (acc["cov"] + F.least(F.lit(k).cast("long"), p - acc["prev"])).alias(
                "cov"
            ),
            p.cast("long").alias("prev"),
        ),
        lambda acc: acc["cov"],
    )
    return base.join(per_doc, "doc_id", "left").select(
        "doc_id",
        "n_tokens",
        F.coalesce("n_grams", F.lit(0).cast("long")).alias("n_grams"),
        F.coalesce("n_dup_grams", F.lit(0).cast("long")).alias("n_dup_grams"),
        F.coalesce(covered, F.lit(0).cast("long")).alias("n_dup_tokens"),
    )


# PageRank constants — the synthetic link-graph formula, damping
# ratio 85/100 and iteration count are MIRRORED in the unrolled
# `pagerank` oracle SQL; change together.
PR_OUTDEG = 4
PR_ITERS = 3


def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Damped PageRank (Page et al. 1998) over a deterministic
    synthetic link graph — the crawl-prioritization / host-centrality
    signal a web pipeline computes over its URL graph (the reference
    has no graph op; this extends the dedup_clusters graph family,
    SURVEY §2 extension).  Each doc emits ``PR_OUTDEG`` outlinks
    dst = knuth_hash(doc_id*PR_OUTDEG + j) % N with self-loops
    dropped, then ``PR_ITERS`` damped iterations.

    Cross-engine exactness — the whole iteration is BIGINT (the
    kmeans unrolled-loop treatment taken to its limit: no floats at
    all): ranks are e9-scaled integers, a node's contribution is
    r_e9 DIV outdeg (integer division), incoming mass is an exact
    integer sum (order-free), and the update is
    r' = 15e9 DIV (100*N)  +  (85 * incoming) DIV 100.
    Dangling nodes (every generated dst collided with self) simply
    leak their mass — the "lost mass" PageRank variant, identical on
    both engines.  DIV truncation loses < 1 e-9 unit per edge/node per
    step, which is the price of exactness.

    Scale shape: the canonical distributed PageRank — edges built by
    a pure map (outdeg computed INSIDE the array before explode: no
    extra agg), one shuffle join edges⋈ranks on src + one dst-keyed
    agg per iteration, ranks re-derived by a left join on the node
    table.  At 100 TB the edge table is hash-partitioned on src once
    (localCheckpoint) and every iteration reuses that partitioning;
    N is a metadata-scale driver scalar."""
    ids = _docs(spark, sf_dir).select("doc_id")
    n = ids.count()  # metadata-scale scalar (node count)

    dsts = F.filter(
        F.transform(
            F.sequence(F.lit(0), F.lit(PR_OUTDEG - 1)),
            lambda j: knuth_hash(F.col("doc_id") * PR_OUTDEG + j) % n,
        ),
        lambda d: d != F.col("doc_id"),
    )
    edges = (
        ids.select(
            F.col("doc_id").alias("src"),
            F.size(dsts).cast("long").alias("outdeg"),
            F.explode(dsts).alias("dst"),
        )
        .localCheckpoint(eager=False)
    )
    base = 15_000_000_000 // (100 * n)
    r = ids.select(
        "doc_id", F.lit(1_000_000_000 // n).cast("long").alias("r_e9")
    )
    for _ in range(PR_ITERS):
        inc = (
            edges.join(r, edges["src"] == r["doc_id"])
            .select("dst", F.expr("r_e9 DIV outdeg").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").cast("long").alias("inc"))
        )
        r = ids.join(inc, ids["doc_id"] == inc["dst"], "left").select(
            "doc_id",
            (
                F.lit(base).cast("long")
                + F.expr("(85 * coalesce(inc, CAST(0 AS BIGINT))) DIV 100")
            ).alias("r_e9"),
        )
    od = edges.groupBy("src").agg(F.max("outdeg").alias("outdeg"))
    ind = edges.groupBy("dst").agg(
        F.count(F.lit(1)).cast("long").alias("indeg")
    )
    return (
        r.join(od, r["doc_id"] == od["src"], "left")
        .join(ind, r["doc_id"] == ind["dst"], "left")
        .select(
            "doc_id",
            F.coalesce("outdeg", F.lit(0).cast("long")).alias("outdeg"),
            F.coalesce("indeg", F.lit(0).cast("long")).alias("indeg"),
            "r_e9",
        )
    )


# HITS iteration count — mirrored in the unrolled oracle SQL; the link
# graph is the SAME knuth-hash edge set as q_pagerank (PR_OUTDEG).
HITS_ITERS = 2


def q_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS hubs-and-authorities (Kleinberg 1999) over the same
    deterministic link graph as ``q_pagerank`` — the second classic
    link-centrality signal a crawl pipeline computes (PageRank ranks
    global importance; HITS separates directories/link-hubs from
    content/authorities, useful for seed-list curation).

    Cross-engine exactness — the pagerank treatment: scores are
    e9-scaled BIGINTs that SUM to ~1e9 across the corpus (so no
    intermediate can overflow int64 at ANY corpus size), each
    half-step is an exact integer sum over edges, and the L1
    normalization is (raw * 1e9) DIV total — L1 instead of the
    textbook L2 precisely so the iteration stays float-free (raw ≤
    1e9, raw*1e9 ≤ 1e18 < 2^63).  DIV truncation < 1e-9 unit per node
    per step is the price of exactness.

    Scale shape: per iteration ONE src-keyed join + dst agg (authority
    half-step) and ONE dst-keyed join + src agg (hub half-step); the
    normalizer is a 1-row agg broadcast back (scalar subquery in the
    oracle) — never a driver action inside the loop.  Edges are built
    by a pure map and localCheckpoint'd so every iteration reuses the
    same partitioning; nodes without in-links (out-links) surface with
    authority (hub) 0 via the final left joins."""
    ids = _docs(spark, sf_dir).select("doc_id")
    n = ids.count()  # metadata-scale scalar (node count)

    dsts = F.filter(
        F.transform(
            F.sequence(F.lit(0), F.lit(PR_OUTDEG - 1)),
            lambda j: knuth_hash(F.col("doc_id") * PR_OUTDEG + j) % n,
        ),
        lambda d: d != F.col("doc_id"),
    )
    edges = ids.select(
        F.col("doc_id").alias("src"), F.explode(dsts).alias("dst")
    ).localCheckpoint(eager=False)

    h = ids.select(
        "doc_id", F.lit(1_000_000_000 // n).cast("long").alias("s")
    )
    a = None
    for _ in range(HITS_ITERS):
        araw = (
            edges.join(h, edges["src"] == h["doc_id"])
            .groupBy("dst")
            .agg(F.sum("s").cast("long").alias("raw"))
        )
        a = araw.crossJoin(
            F.broadcast(araw.agg(F.sum("raw").cast("long").alias("tot")))
        ).select(
            F.col("dst").alias("doc_id"),
            F.expr("(raw * 1000000000) DIV tot").alias("s"),
        )
        hraw = (
            edges.join(a, edges["dst"] == a["doc_id"])
            .groupBy("src")
            .agg(F.sum("s").cast("long").alias("raw"))
        )
        h = hraw.crossJoin(
            F.broadcast(hraw.agg(F.sum("raw").cast("long").alias("tot")))
        ).select(
            F.col("src").alias("doc_id"),
            F.expr("(raw * 1000000000) DIV tot").alias("s"),
        )
    auth = a.withColumnRenamed("s", "auth_e9")
    hub = h.withColumnRenamed("s", "hub_e9")
    return (
        ids.join(auth, "doc_id", "left")
        .join(hub, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("auth_e9", F.lit(0).cast("long")).alias("auth_e9"),
            F.coalesce("hub_e9", F.lit(0).cast("long")).alias("hub_e9"),
        )
    )


# Label-propagation iteration count — mirrored in the unrolled
# `label_propagation` oracle SQL; the link graph is the SAME
# knuth-hash edge set as q_pagerank (PR_OUTDEG), made undirected.
LPA_ITERS = 3


def q_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-propagation community detection (Raghavan et al. 2007)
    over the undirected version of the `pagerank` link graph — the
    host/community clustering signal a crawl pipeline uses for
    domain-level dedup scoping and crawl-frontier partitioning
    (completes the graph family: pagerank = importance, hits =
    hubs/authorities, dedup_clusters = components, this = communities).

    Deterministic synchronous LPA: l0(v) = v; each step counts
    neighbor labels over the undirected multi-edge set (src→dst union
    dst→src — parallel edges weight the vote, deterministically) and
    takes the majority with the (count DESC, label ASC) rule;
    isolated nodes keep their label.  Everything is BIGINT counts and
    ids — exact cross-engine by construction, no floats anywhere.

    Scale shape: the canonical distributed LPA — edges built by a
    pure map and localCheckpoint'd once (every iteration reuses the
    partitioning); per step ONE src-keyed join + (node,label) agg +
    ONE struct-max majority agg (no window over data rows), then a
    node-table left join.  Output is (doc_id, label, comm size)."""
    ids = _docs(spark, sf_dir).select("doc_id")
    n = ids.count()  # metadata-scale scalar (node count)

    dsts = F.filter(
        F.transform(
            F.sequence(F.lit(0), F.lit(PR_OUTDEG - 1)),
            lambda j: knuth_hash(F.col("doc_id") * PR_OUTDEG + j) % n,
        ),
        lambda d: d != F.col("doc_id"),
    )
    de = ids.select(
        F.col("doc_id").alias("src"), F.explode(dsts).alias("dst")
    )
    und = (
        de.select("src", "dst")
        .unionAll(
            de.select(
                F.col("dst").alias("src"), F.col("src").alias("dst")
            )
        )
        .localCheckpoint(eager=False)
    )
    lab = ids.select("doc_id", F.col("doc_id").alias("lbl"))
    for _ in range(LPA_ITERS):
        cnts = (
            und.join(lab, und["src"] == lab["doc_id"])
            .groupBy(und["dst"].alias("node"), "lbl")
            .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        )
        maj = (
            cnts.groupBy("node")
            .agg(
                F.max(
                    F.struct(
                        F.col("cnt").alias("cnt"),
                        (-F.col("lbl")).alias("neg_lbl"),
                    )
                ).alias("b")
            )
            .select("node", (-F.col("b.neg_lbl")).alias("maj"))
        )
        lab = lab.join(maj, lab["doc_id"] == maj["node"], "left").select(
            "doc_id", F.coalesce("maj", "lbl").cast("long").alias("lbl")
        )
    sizes = lab.groupBy("lbl").agg(
        F.count(F.lit(1)).cast("long").alias("comm_size")
    )
    return lab.join(sizes, "lbl").select(
        "doc_id", F.col("lbl").alias("label"), "comm_size"
    )


def _lpa_ctes(outdeg: int = PR_OUTDEG, iters: int = LPA_ITERS) -> str:
    """The LPA WITH-chain (knuth edges → undirected u → unrolled
    iteration triples ending at l{iters}) — SHARED by the
    `label_propagation` AND `graph_modularity` oracles (the
    _logreg_ctes rule: edit once, both move)."""
    head = f"""WITH ids AS (
  SELECT doc_id FROM documents
), nn AS (
  SELECT CAST(count(*) AS BIGINT) AS n FROM ids
), e0 AS (
  SELECT doc_id AS src,
         unnest(generate_series(0, {outdeg - 1})) AS j
  FROM ids
), e1 AS (
  SELECT src,
         ((((src * {outdeg} + j) % {KNUTH_P}) * {KNUTH_A}) % {KNUTH_P})
           % (SELECT n FROM nn) AS dst
  FROM e0
), e2 AS (
  SELECT src, dst FROM e1 WHERE dst <> src
), u AS (
  SELECT src, dst FROM e2
  UNION ALL
  SELECT dst AS src, src AS dst FROM e2
), l0 AS (
  SELECT doc_id, CAST(doc_id AS BIGINT) AS lbl FROM ids
)"""
    for t in range(1, iters + 1):
        head += f""",
c{t} AS (
  SELECT u.dst AS node, l.lbl, CAST(count(*) AS BIGINT) AS cnt
  FROM u JOIN l{t - 1} l ON u.src = l.doc_id GROUP BY 1, 2
), m{t} AS (
  SELECT node, lbl FROM (
    SELECT node, lbl, row_number() OVER (
      PARTITION BY node ORDER BY cnt DESC, lbl) AS rn
    FROM c{t})
  WHERE rn = 1
), l{t} AS (
  SELECT i.doc_id, CAST(coalesce(m.lbl, p.lbl) AS BIGINT) AS lbl
  FROM ids i JOIN l{t - 1} p USING (doc_id)
  LEFT JOIN m{t} m ON i.doc_id = m.node
)"""
    return head


def _label_propagation_sql(
    outdeg: int = PR_OUTDEG, iters: int = LPA_ITERS
) -> str:
    """LPA oracle: the pagerank edge CTEs made undirected (UNION ALL
    both directions — parallel edges kept), then each iteration
    UNROLLED as (counts, majority-by-window, relabel) CTE triples —
    all BIGINT, the (cnt DESC, lbl) rule, exact by construction."""
    return _lpa_ctes(outdeg, iters) + f"""
SELECT l.doc_id, l.lbl AS label, s.comm_size
FROM l{iters} l JOIN (
  SELECT lbl, CAST(count(*) AS BIGINT) AS comm_size
  FROM l{iters} GROUP BY 1
) s USING (lbl)
"""


def q_graph_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman modularity of the LPA partition (Newman & Girvan 2004)
    over the SAME undirected multigraph `label_propagation` votes on
    — the quality score that tells a pipeline whether the detected
    communities are real structure or noise (Q ≈ 0 on the random
    knuth graph, Q → 1 on strongly modular link farms).  Per
    community: node count, internal directed-edge count, degree sum,
    and the modularity contribution dQ = in/(2m) − (deg/(2m))²;
    Σ dq_e9 ≈ Q·1e9.  The SEVENTH knuth-graph consumer (pagerank /
    hits / lpa / triangles / link_predict / khop) — changing the edge
    formula or PR_OUTDEG moves all seven oracles.

    Cross-engine: in_deg / deg_sum / m2 are exact BIGINTs (u counts
    both directions, so m2 = 2m and in_deg counts each internal edge
    twice — the standard Σ_c [in_c/2m − (d_c/2m)²] form); dq_e9 is an
    e9 floor of an expression using ONLY IEEE +,−,×,÷ on doubles that
    are exact (< 2^53 to ~10^15 edges) — bit-identical cross-engine,
    a STRONGER guarantee than the ln-based e3 floors.  Isolated
    nodes coalesce to deg 0 / in 0.

    Scale shape: the LPA label table (3 bounded join-agg rounds) +
    ONE degree agg of the edge table + ONE two-sided label join for
    internal edges + a per-community agg; m2 via the 1-row
    broadcast-scalar crossJoin.  Output is community-count-bounded."""
    ids = _docs(spark, sf_dir).select("doc_id")
    n = ids.count()  # metadata-scale scalar (node count)

    dsts = F.filter(
        F.transform(
            F.sequence(F.lit(0), F.lit(PR_OUTDEG - 1)),
            lambda j: knuth_hash(F.col("doc_id") * PR_OUTDEG + j) % n,
        ),
        lambda d: d != F.col("doc_id"),
    )
    de = ids.select(
        F.col("doc_id").alias("src"), F.explode(dsts).alias("dst")
    )
    und = (
        de.select("src", "dst")
        .unionAll(
            de.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .localCheckpoint(eager=False)
    )
    nl = q_label_propagation(spark, sf_dir).select("doc_id", "label")
    deg = und.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).cast("long").alias("deg")
    )
    m2 = und.agg(F.count(F.lit(1)).cast("long").alias("m2"))
    incnt = (
        und.join(
            nl.select(
                F.col("doc_id").alias("s_id"), F.col("label").alias("s_lbl")
            ),
            F.col("src") == F.col("s_id"),
        )
        .join(
            nl.select(
                F.col("doc_id").alias("d_id"), F.col("label").alias("d_lbl")
            ),
            F.col("dst") == F.col("d_id"),
        )
        .where(F.col("s_lbl") == F.col("d_lbl"))
        .groupBy(F.col("s_lbl").alias("label"))
        .agg(F.count(F.lit(1)).cast("long").alias("in_deg"))
    )
    comm = (
        nl.join(deg, nl["doc_id"] == deg["node"], "left")
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_nodes"),
            F.coalesce(F.sum("deg"), F.lit(0)).cast("long").alias("deg_sum"),
        )
    )
    return (
        comm.join(incnt, "label", "left")
        .crossJoin(F.broadcast(m2))
        .select(
            "label",
            "n_nodes",
            "deg_sum",
            F.expr("CAST(coalesce(in_deg, 0) AS BIGINT)").alias("in_deg"),
            F.expr(
                "CAST(floor((CAST(coalesce(in_deg, 0) AS DOUBLE) / m2"
                " - (CAST(deg_sum AS DOUBLE) / m2)"
                " * (CAST(deg_sum AS DOUBLE) / m2))"
                " * 1000000000.0) AS BIGINT)"
            ).alias("dq_e9"),
        )
    )


def _graph_modularity_sql(
    outdeg: int = PR_OUTDEG, iters: int = LPA_ITERS
) -> str:
    """graph_modularity oracle: the shared `_lpa_ctes` chain, then
    BIGINT degree/internal-edge/size aggs and the bit-exact e9-floored
    dQ expression (identical float op order to the Spark side)."""
    return _lpa_ctes(outdeg, iters) + f""",
deg AS (
  SELECT src AS node, CAST(count(*) AS BIGINT) AS deg FROM u GROUP BY 1
), mm AS (
  SELECT CAST(count(*) AS BIGINT) AS m2 FROM u
), nl AS (
  SELECT doc_id, lbl AS label FROM l{iters}
), incnt AS (
  SELECT ls.label, CAST(count(*) AS BIGINT) AS in_deg
  FROM u JOIN nl ls ON u.src = ls.doc_id
         JOIN nl ld ON u.dst = ld.doc_id
  WHERE ls.label = ld.label GROUP BY 1
), comm AS (
  SELECT nl.label, CAST(count(*) AS BIGINT) AS n_nodes,
         CAST(coalesce(sum(d.deg), 0) AS BIGINT) AS deg_sum
  FROM nl LEFT JOIN deg d ON nl.doc_id = d.node GROUP BY 1
)
SELECT c.label, c.n_nodes, c.deg_sum,
       CAST(coalesce(i.in_deg, 0) AS BIGINT) AS in_deg,
       CAST(floor((CAST(coalesce(i.in_deg, 0) AS DOUBLE) / m2
                   - (CAST(c.deg_sum AS DOUBLE) / m2)
                   * (CAST(c.deg_sum AS DOUBLE) / m2))
                  * 1000000000.0) AS BIGINT) AS dq_e9
FROM comm c LEFT JOIN incnt i ON c.label = i.label CROSS JOIN mm
"""


def q_degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity of the link graph (Newman 2002 "Assortative
    Mixing in Networks") — the Pearson correlation of endpoint degrees
    over edges: do hubs link to hubs (r > 0, social-web shape) or to
    leaves (r < 0, crawl-frontier / link-farm shape)?  The EIGHTH
    knuth-graph consumer (pagerank/hits/lpa/triangles/link_predict/
    khop/modularity) — changing the edge formula or ``PR_OUTDEG``
    moves all eight oracles.  Expect r ≈ 0 on this random graph.

    Semantics: over the undirected multi-edge table u (both
    directions), x = deg(src), y = deg(dst); because u is symmetric
    the x/y marginals coincide, so r = (M·Σxy − (Σx)²)/(M·Σx² −
    (Σx)²) — no sqrt needed (the test asserts the symmetry).

    Cross-engine: sums accumulate as DECIMAL(38,0) ↔ HUGEINT (exact
    128-bit on BOTH engines — plain BIGINT Σxy overflows at ~10^13
    edges × hub degrees); outputs cast BIGINT; r_e6 is an e6 floor
    over IEEE ×,−,÷ on the correctly-rounded doubles of those exact
    sums — bit-identical cross-engine (the graph_modularity class).

    Scale shape: edges are a pure map; ONE degree agg + one src-key
    join + one dst-key join + ONE scalar agg.  Output is one row."""
    ids = _docs(spark, sf_dir).select("doc_id")
    n = ids.count()  # metadata-scale scalar (node count)

    dsts = F.filter(
        F.transform(
            F.sequence(F.lit(0), F.lit(PR_OUTDEG - 1)),
            lambda j: knuth_hash(F.col("doc_id") * PR_OUTDEG + j) % n,
        ),
        lambda d: d != F.col("doc_id"),
    )
    de = ids.select(
        F.col("doc_id").alias("src"), F.explode(dsts).alias("dst")
    )
    und = (
        de.select("src", "dst")
        .unionAll(
            de.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .localCheckpoint(eager=False)
    )
    deg = und.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).cast("long").alias("deg")
    )
    xy = (
        und.join(
            deg.select(
                F.col("node").alias("s_n"), F.col("deg").alias("x")
            ),
            F.col("src") == F.col("s_n"),
        )
        .join(
            deg.select(
                F.col("node").alias("d_n"), F.col("deg").alias("y")
            ),
            F.col("dst") == F.col("d_n"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("m2"),
            F.sum(F.col("x").cast("decimal(38,0)")).alias("sx"),
            F.sum((F.col("x") * F.col("y")).cast("decimal(38,0)")).alias(
                "sxy"
            ),
            F.sum((F.col("x") * F.col("x")).cast("decimal(38,0)")).alias(
                "sx2"
            ),
        )
    )
    return xy.select(
        "m2",
        F.expr("CAST(sx AS BIGINT)").alias("sum_deg"),
        F.expr("CAST(sxy AS BIGINT)").alias("sum_xy"),
        F.expr("CAST(sx2 AS BIGINT)").alias("sum_x2"),
        F.expr(
            "CAST(CASE WHEN (CAST(m2 AS DOUBLE) * CAST(sx2 AS DOUBLE)"
            " - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) <> 0.0 THEN"
            " floor((CAST(m2 AS DOUBLE) * CAST(sxy AS DOUBLE)"
            " - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"
            " / (CAST(m2 AS DOUBLE) * CAST(sx2 AS DOUBLE)"
            " - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) * 1000000.0)"
            " ELSE 0 END AS BIGINT)"
        ).alias("r_e6"),
    )


def _degree_assortativity_sql(outdeg: int = PR_OUTDEG) -> str:
    """degree_assortativity oracle: the knuth edge CTEs, HUGEINT
    sums cast BIGINT, and the bit-exact e6-floored symmetric Pearson
    expression (identical float op order)."""
    return f"""
WITH ids AS (
  SELECT doc_id FROM documents
), nn AS (
  SELECT CAST(count(*) AS BIGINT) AS n FROM ids
), e0 AS (
  SELECT doc_id AS src,
         unnest(generate_series(0, {outdeg - 1})) AS j
  FROM ids
), e1 AS (
  SELECT src,
         ((((src * {outdeg} + j) % {KNUTH_P}) * {KNUTH_A}) % {KNUTH_P})
           % (SELECT n FROM nn) AS dst
  FROM e0
), e2 AS (
  SELECT src, dst FROM e1 WHERE dst <> src
), u AS (
  SELECT src, dst FROM e2
  UNION ALL
  SELECT dst AS src, src AS dst FROM e2
), deg AS (
  SELECT src AS node, CAST(count(*) AS BIGINT) AS deg FROM u GROUP BY 1
), agg AS (
  SELECT CAST(count(*) AS BIGINT) AS m2,
         sum(ds.deg) AS sx,
         sum(ds.deg * dd.deg) AS sxy,
         sum(ds.deg * ds.deg) AS sx2
  FROM u JOIN deg ds ON u.src = ds.node
         JOIN deg dd ON u.dst = dd.node
)
SELECT m2,
       CAST(sx AS BIGINT) AS sum_deg,
       CAST(sxy AS BIGINT) AS sum_xy,
       CAST(sx2 AS BIGINT) AS sum_x2,
       CAST(CASE WHEN (CAST(m2 AS DOUBLE) * CAST(sx2 AS DOUBLE)
                       - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) <> 0.0
            THEN floor((CAST(m2 AS DOUBLE) * CAST(sxy AS DOUBLE)
                        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                       / (CAST(m2 AS DOUBLE) * CAST(sx2 AS DOUBLE)
                          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                       * 1000000.0)
            ELSE 0 END AS BIGINT) AS r_e6
FROM agg
"""


def q_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle counts + local clustering coefficient over
    the simple undirected version of the `pagerank` link graph — the
    fourth classic graph signal a crawl pipeline computes (pagerank =
    importance, hits = hubs/authorities, label_propagation =
    communities, this = local density: link-farm rings and
    boilerplate navigation cliques light up as high-clustering
    neighborhoods).

    Semantics: directed knuth-hash edges → DISTINCT undirected pairs
    (a < b, self-loops dropped); degree = simple-graph degree; each
    triangle is counted ONCE at its minimum-(degree, id) corner via
    degree orientation, then credited to all three corners.
    lcc_e5 = (2·n_tri·1e5) DIV (deg·(deg−1)) for deg ≥ 2 else 0 —
    all-BIGINT, exact cross-engine by construction (the pagerank
    treatment: no floats anywhere).

    Scale shape: the compact-forward / degree-orientation algorithm —
    orienting every edge from its lower-(deg, id) endpoint bounds each
    node's out-neighborhood by O(sqrt(m)) on ANY degree distribution,
    so the wedge self-join (the only superlinear step) generates
    Σ d_out(v)² = O(m^1.5) candidates worst-case instead of the
    Σ deg(v)² a naive neighbor join pays on skewed web graphs; wedges
    close via one equi-join on the (v1, v2) pair key.  Edges are a
    pure map, `und`/`orient` are localCheckpoint'd and reused, and
    every join is a plain hash equi-join on node/pair keys."""
    ids = _docs(spark, sf_dir).select("doc_id")
    n = ids.count()  # metadata-scale scalar (node count)

    dsts = F.filter(
        F.transform(
            F.sequence(F.lit(0), F.lit(PR_OUTDEG - 1)),
            lambda j: knuth_hash(F.col("doc_id") * PR_OUTDEG + j) % n,
        ),
        lambda d: d != F.col("doc_id"),
    )
    de = ids.select(
        F.col("doc_id").alias("src"), F.explode(dsts).alias("dst")
    )
    und = (
        de.select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    deg = (
        und.select(F.col("a").alias("node"))
        .unionAll(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("deg"))
    )
    da = deg.select(F.col("node").alias("a"), F.col("deg").alias("deg_a"))
    db = deg.select(F.col("node").alias("b"), F.col("deg").alias("deg_b"))
    # orient low-(deg, id) → high; a < b already, so the tuple rule
    # (deg_a, a) <= (deg_b, b) reduces to deg_a <= deg_b — mirrored.
    low = F.col("deg_a") <= F.col("deg_b")
    orient = (
        und.join(da, "a")
        .join(db, "b")
        .select(
            F.when(low, F.col("a")).otherwise(F.col("b")).alias("u"),
            F.when(low, F.col("b")).otherwise(F.col("a")).alias("v"),
        )
        .localCheckpoint(eager=False)
    )
    wedges = (
        orient.select("u", F.col("v").alias("v1"))
        .join(orient.select("u", F.col("v").alias("v2")), "u")
        .where(F.col("v1") < F.col("v2"))
    )
    tri = wedges.join(
        und,
        (wedges["v1"] == und["a"]) & (wedges["v2"] == und["b"]),
    ).select("u", "v1", "v2")
    ntri = (
        tri.select(F.col("u").alias("node"))
        .unionAll(tri.select(F.col("v1").alias("node")))
        .unionAll(tri.select(F.col("v2").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("n_tri"))
    )
    return (
        ids.join(deg, ids["doc_id"] == deg["node"], "left")
        .drop("node")
        .join(ntri, ids["doc_id"] == ntri["node"], "left")
        .select(
            "doc_id",
            F.coalesce("deg", F.lit(0).cast("long")).alias("degree"),
            F.coalesce("n_tri", F.lit(0).cast("long")).alias("n_tri"),
        )
        .select(
            "doc_id",
            "degree",
            "n_tri",
            F.when(
                F.col("degree") >= 2,
                F.expr(
                    "(2 * n_tri * 100000) DIV (degree * (degree - 1))"
                ),
            )
            .otherwise(F.lit(0))
            .cast("long")
            .alias("lcc_e5"),
        )
    )


def _triangle_count_sql(outdeg: int = PR_OUTDEG) -> str:
    """triangle_count oracle: the pagerank edge CTEs → distinct
    undirected pairs → simple degrees → degree orientation (deg_a <=
    deg_b rule, mirrored) → wedge self-join closed against the pair
    set → per-corner credit — all BIGINT, exact by construction."""
    return f"""WITH ids AS (
  SELECT doc_id FROM documents
), nn AS (
  SELECT CAST(count(*) AS BIGINT) AS n FROM ids
), e0 AS (
  SELECT doc_id AS src,
         unnest(generate_series(0, {outdeg - 1})) AS j
  FROM ids
), e1 AS (
  SELECT src,
         ((((src * {outdeg} + j) % {KNUTH_P}) * {KNUTH_A}) % {KNUTH_P})
           % (SELECT n FROM nn) AS dst
  FROM e0
), e2 AS (
  SELECT src, dst FROM e1 WHERE dst <> src
), und AS (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
  FROM e2
), deg AS (
  SELECT node, CAST(count(*) AS BIGINT) AS deg FROM (
    SELECT a AS node FROM und UNION ALL SELECT b AS node FROM und)
  GROUP BY 1
), orient AS (
  SELECT CASE WHEN da.deg <= db.deg THEN u.a ELSE u.b END AS u,
         CASE WHEN da.deg <= db.deg THEN u.b ELSE u.a END AS v
  FROM und u
  JOIN deg da ON u.a = da.node
  JOIN deg db ON u.b = db.node
), tri AS (
  SELECT o1.u, o1.v AS v1, o2.v AS v2
  FROM orient o1
  JOIN orient o2 ON o1.u = o2.u AND o1.v < o2.v
  JOIN und ON und.a = o1.v AND und.b = o2.v
), ntri AS (
  SELECT node, CAST(count(*) AS BIGINT) AS n_tri FROM (
    SELECT u AS node FROM tri
    UNION ALL SELECT v1 AS node FROM tri
    UNION ALL SELECT v2 AS node FROM tri)
  GROUP BY 1
)
SELECT i.doc_id,
  CAST(coalesce(deg.deg, 0) AS BIGINT) AS degree,
  CAST(coalesce(ntri.n_tri, 0) AS BIGINT) AS n_tri,
  CAST(CASE WHEN coalesce(deg.deg, 0) >= 2
       THEN (2 * coalesce(ntri.n_tri, 0) * 100000)
            // (deg.deg * (deg.deg - 1))
       ELSE 0 END AS BIGINT) AS lcc_e5
FROM ids i
LEFT JOIN deg ON i.doc_id = deg.node
LEFT JOIN ntri ON i.doc_id = ntri.node
"""


def q_link_predict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link prediction over the simple undirected `pagerank` link graph
    — the FIFTH consumer of the shared knuth edge set (pagerank =
    importance, hits = hubs/authorities, label_propagation =
    communities, triangle_count = density, this = missing-edge
    scoring): for every distance-2 NON-edge pair, the three classic
    neighborhood scores — common-neighbor count, Jaccard, and
    Adamic-Adar (Liben-Nowell & Kleinberg 2003).  A crawl pipeline
    reads these as "hosts that should link but don't" — seed
    candidates for frontier expansion and mirror discovery.

    Semantics: distinct undirected pairs a < b (the triangle_count
    graph); candidate pairs are wedge endpoints (v1 < v2, both
    adjacent to some z) minus existing edges.  cn = #common
    neighbors; jac_e5 = (cn·1e5) DIV (deg_a + deg_b − cn);
    aa_e3 = Σ_z 1e6 DIV floor(ln(deg_z)·1e3) — the e3-floored-log
    integer discipline (zipf_alpha), and deg_z ≥ 2 ALWAYS for a wedge
    center of a simple graph (it has two distinct neighbors), so the
    divisor is ≥ 693 by construction, no zero guard needed.  All
    BIGINT — exact cross-engine.

    Scale shape: edges are a pure map, `und` localCheckpoint'd and
    reused; the wedge self-join fans out Σ deg(z)² rows — bounded
    here by the PR_OUTDEG-regular construction, and at 100 TB a hub
    degree cap (the dedup bucket-cap discipline) bounds it the same
    way; everything after is hash equi-joins + one (v1,v2) agg."""
    ids = _docs(spark, sf_dir).select("doc_id")
    n = ids.count()  # metadata-scale scalar (node count)

    dsts = F.filter(
        F.transform(
            F.sequence(F.lit(0), F.lit(PR_OUTDEG - 1)),
            lambda j: knuth_hash(F.col("doc_id") * PR_OUTDEG + j) % n,
        ),
        lambda d: d != F.col("doc_id"),
    )
    de = ids.select(
        F.col("doc_id").alias("src"), F.explode(dsts).alias("dst")
    )
    und = (
        de.select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    adj = und.select(F.col("a").alias("z"), F.col("b").alias("v")).unionAll(
        und.select(F.col("b").alias("z"), F.col("a").alias("v"))
    )
    deg = adj.groupBy(F.col("z").alias("node")).agg(
        F.count(F.lit(1)).cast("long").alias("deg")
    )
    # attach the wedge-center AA weight once per adjacency row
    adjw = adj.join(deg, adj["z"] == deg["node"]).select(
        "z",
        "v",
        # deg-1 centers produce no wedge, but ANSI evaluates w on every
        # adjacency row BEFORE the self-join prunes them — guard ln(1)=0
        F.expr(
            "CASE WHEN deg >= 2 THEN 1000000 DIV"
            " CAST(floor(ln(CAST(deg AS DOUBLE)) * 1000.0) AS BIGINT)"
            " ELSE 0 END"
        ).alias("w"),
    )
    wedges = (
        adjw.select("z", F.col("v").alias("v1"), "w")
        .join(adj.select("z", F.col("v").alias("v2")), "z")
        .where(F.col("v1") < F.col("v2"))
    )
    cand = (
        wedges.groupBy(F.col("v1").alias("a"), F.col("v2").alias("b"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("cn"),
            F.sum("w").cast("long").alias("aa_e3"),
        )
        .join(und, ["a", "b"], "left_anti")
    )
    da = deg.select(F.col("node").alias("a"), F.col("deg").alias("deg_a"))
    db = deg.select(F.col("node").alias("b"), F.col("deg").alias("deg_b"))
    return (
        cand.join(da, "a")
        .join(db, "b")
        .select(
            "a",
            "b",
            "cn",
            "deg_a",
            "deg_b",
            F.expr("(cn * 100000) DIV (deg_a + deg_b - cn)").alias(
                "jac_e5"
            ),
            "aa_e3",
        )
    )


def _link_predict_sql(outdeg: int = PR_OUTDEG) -> str:
    """link_predict oracle: the triangle_count edge CTEs → adjacency
    both directions → wedge self-join (v1 < v2) with the e3-floored-ln
    AA weight attached at the wedge center → (pair) agg → anti-join
    existing edges → degree joins — all BIGINT, exact by
    construction."""
    return f"""WITH ids AS (
  SELECT doc_id FROM documents
), nn AS (
  SELECT CAST(count(*) AS BIGINT) AS n FROM ids
), e0 AS (
  SELECT doc_id AS src,
         unnest(generate_series(0, {outdeg - 1})) AS j
  FROM ids
), e1 AS (
  SELECT src,
         ((((src * {outdeg} + j) % {KNUTH_P}) * {KNUTH_A}) % {KNUTH_P})
           % (SELECT n FROM nn) AS dst
  FROM e0
), e2 AS (
  SELECT src, dst FROM e1 WHERE dst <> src
), und AS (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
  FROM e2
), adj AS (
  SELECT a AS z, b AS v FROM und
  UNION ALL
  SELECT b AS z, a AS v FROM und
), deg AS (
  SELECT z AS node, CAST(count(*) AS BIGINT) AS deg FROM adj GROUP BY 1
), adjw AS (
  SELECT adj.z, adj.v,
         CASE WHEN deg.deg >= 2 THEN
           1000000 // CAST(floor(ln(CAST(deg.deg AS DOUBLE)) * 1000.0)
                           AS BIGINT)
         ELSE 0 END AS w
  FROM adj JOIN deg ON adj.z = deg.node
), wedges AS (
  SELECT a1.v AS v1, a2.v AS v2, a1.w
  FROM adjw a1 JOIN adj a2 ON a1.z = a2.z AND a1.v < a2.v
), cand AS (
  SELECT w.v1 AS a, w.v2 AS b,
         CAST(count(*) AS BIGINT) AS cn,
         CAST(sum(w.w) AS BIGINT) AS aa_e3
  FROM wedges w
  LEFT JOIN und ON und.a = w.v1 AND und.b = w.v2
  WHERE und.a IS NULL
  GROUP BY 1, 2
)
SELECT c.a, c.b, c.cn, da.deg AS deg_a, db.deg AS deg_b,
       CAST((c.cn * 100000) // (da.deg + db.deg - c.cn) AS BIGINT)
         AS jac_e5,
       c.aa_e3
FROM cand c
JOIN deg da ON c.a = da.node
JOIN deg db ON c.b = db.node
"""


def q_khop_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-hop neighborhood reach over the simple undirected `pagerank`
    link graph — the SIXTH consumer of the shared knuth edge set, and
    the crawl-frontier growth metric (importance, hubs, communities,
    density, missing links, and now REACH: how many hosts a 2-step
    frontier expansion from v touches).  A node whose 2-hop reach
    barely exceeds its degree sits in a closed clique (link farm); a
    reach near deg² is an efficient expander worth crawl budget.

    Semantics: distinct undirected pairs a < b (the triangle_count
    graph); reach1 = |N(v)|, reach2 = |{u : dist(v,u) ≤ 2}| \\ {v};
    expansion_e3 = (reach2·1e3) DIV reach1 for reach1 > 0 — all
    BIGINT, exact cross-engine by construction.

    Scale shape: the 2-hop set is the adjacency self-join on the
    middle node — Σ deg(m)² fan-out, the link_predict/wedge bound
    (PR_OUTDEG-regular here; hub-degree caps bound it at 100 TB) —
    followed by a DISTINCT (v, u) agg and one per-v count; every join
    is a hash equi-join on node keys."""
    ids = _docs(spark, sf_dir).select("doc_id")
    n = ids.count()  # metadata-scale scalar (node count)

    dsts = F.filter(
        F.transform(
            F.sequence(F.lit(0), F.lit(PR_OUTDEG - 1)),
            lambda j: knuth_hash(F.col("doc_id") * PR_OUTDEG + j) % n,
        ),
        lambda d: d != F.col("doc_id"),
    )
    de = ids.select(
        F.col("doc_id").alias("src"), F.explode(dsts).alias("dst")
    )
    und = (
        de.select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    adj = und.select(F.col("a").alias("v"), F.col("b").alias("u")).unionAll(
        und.select(F.col("b").alias("v"), F.col("a").alias("u"))
    )
    two = (
        adj.select(F.col("v"), F.col("u").alias("m"))
        .join(adj.select(F.col("v").alias("m2"), F.col("u")), F.col("m") == F.col("m2"))
        .where(F.col("u") != F.col("v"))
        .select("v", "u")
    )
    reach2 = (
        adj.select("v", "u")
        .unionAll(two)
        .distinct()
        .groupBy("v")
        .agg(F.count(F.lit(1)).cast("long").alias("reach2"))
    )
    deg = adj.groupBy("v").agg(
        F.count(F.lit(1)).cast("long").alias("reach1")
    )
    return (
        ids.join(deg, ids["doc_id"] == deg["v"], "left")
        .drop("v")
        .join(reach2, ids["doc_id"] == reach2["v"], "left")
        .select(
            "doc_id",
            F.coalesce("reach1", F.lit(0).cast("long")).alias("reach1"),
            F.coalesce("reach2", F.lit(0).cast("long")).alias("reach2"),
        )
        .withColumn(
            "expansion_e3",
            F.when(
                F.col("reach1") > 0,
                F.expr("(reach2 * 1000) DIV reach1"),
            )
            .otherwise(F.lit(0))
            .cast("long"),
        )
    )


def _khop_sql(outdeg: int = PR_OUTDEG) -> str:
    """khop_reach oracle: the triangle_count edge CTEs → adjacency
    both directions → middle-node self-join for the 2-hop set →
    DISTINCT union with the 1-hop set → per-node counts — all BIGINT,
    exact by construction."""
    return f"""WITH ids AS (
  SELECT doc_id FROM documents
), nn AS (
  SELECT CAST(count(*) AS BIGINT) AS n FROM ids
), e0 AS (
  SELECT doc_id AS src,
         unnest(generate_series(0, {outdeg - 1})) AS j
  FROM ids
), e1 AS (
  SELECT src,
         ((((src * {outdeg} + j) % {KNUTH_P}) * {KNUTH_A}) % {KNUTH_P})
           % (SELECT n FROM nn) AS dst
  FROM e0
), e2 AS (
  SELECT src, dst FROM e1 WHERE dst <> src
), und AS (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
  FROM e2
), adj AS (
  SELECT a AS v, b AS u FROM und
  UNION ALL
  SELECT b AS v, a AS u FROM und
), two AS (
  SELECT a1.v, a2.u
  FROM adj a1 JOIN adj a2 ON a1.u = a2.v
  WHERE a2.u <> a1.v
), r2 AS (
  SELECT v, CAST(count(*) AS BIGINT) AS reach2 FROM (
    SELECT DISTINCT v, u FROM (
      SELECT v, u FROM adj UNION ALL SELECT v, u FROM two))
  GROUP BY 1
), deg AS (
  SELECT v, CAST(count(*) AS BIGINT) AS reach1 FROM adj GROUP BY 1
)
SELECT i.doc_id,
  CAST(coalesce(deg.reach1, 0) AS BIGINT) AS reach1,
  CAST(coalesce(r2.reach2, 0) AS BIGINT) AS reach2,
  CAST(CASE WHEN coalesce(deg.reach1, 0) > 0
       THEN (coalesce(r2.reach2, 0) * 1000) // deg.reach1
       ELSE 0 END AS BIGINT) AS expansion_e3
FROM ids i
LEFT JOIN deg ON i.doc_id = deg.v
LEFT JOIN r2 ON i.doc_id = r2.v
"""


# k-core peel constants — mirrored in the unrolled `_kcore_sql` oracle.
# K=7 is sized to the knuth graph's 5-10 degree band so BOTH branches
# (peeled rounds 1..PEELS and in-core survivors) fire at every SF
# (verified: sf0.01 peels 105/107/169 leaving 119; sf0.1 peels 9/4/3
# leaving 4984).  The SEVENTH knuth-edge-graph consumer (with
# pagerank/hits/lpa/triangles/link_predict/khop_reach).
KCORE_K = 7
KCORE_PEELS = 3


def q_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-core decomposition (synchronous peel, Matula & Beck 1983 /
    Batagelj-Zaveršnik) over the undirected `pagerank` link graph —
    the crawl-graph density filter a web pipeline uses to find the
    densely-linked center of the web (spam farms and link hubs
    concentrate in high cores; orphan/periphery pages peel early) and
    to prioritize recrawl budget.

    Semantics: round t removes EVERY node whose degree among current
    survivors is < KCORE_K (synchronous — all removals of a round see
    the same survivor set), for KCORE_PEELS rounds; `removed_round` is
    the peel round (0 = survived all rounds = the approximate K-core),
    `core_deg` the survivor-subgraph degree (0 for peeled nodes).  A
    fixed round count instead of peel-to-convergence is the bounded-
    iteration discipline every unrolled loop here follows (kmeans,
    pagerank, LPA).

    Cross-engine exactness: pure BIGINT ids/degrees/flags — exact by
    construction, no floats anywhere.

    Scale shape: the canonical distributed k-core — the undirected
    edge set is built by a pure map and localCheckpoint'd once; each
    round is two semi-joins of edges against the survivor set + one
    v-keyed count agg + one degree-filter anti/semi join; removal
    rounds accumulate by unionAll of anti-joins.  No window, no sort;
    at 100 TB every step is a hash equi-join on node keys."""
    ids = _docs(spark, sf_dir).select("doc_id")
    n = ids.count()  # metadata-scale scalar (node count)

    dsts = F.filter(
        F.transform(
            F.sequence(F.lit(0), F.lit(PR_OUTDEG - 1)),
            lambda j: knuth_hash(F.col("doc_id") * PR_OUTDEG + j) % n,
        ),
        lambda d: d != F.col("doc_id"),
    )
    de = ids.select(
        F.col("doc_id").alias("src"), F.explode(dsts).alias("dst")
    )
    und = (
        de.select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    adj = und.select(F.col("a").alias("v"), F.col("b").alias("u")).unionAll(
        und.select(F.col("b").alias("v"), F.col("a").alias("u"))
    )
    deg0 = adj.groupBy("v").agg(
        F.count(F.lit(1)).cast("long").alias("deg0")
    )

    alive = ids.select(F.col("doc_id").alias("v"))
    removed = None
    for t in range(1, KCORE_PEELS + 1):
        ea = adj.join(
            alive.withColumnRenamed("v", "av"), F.col("v") == F.col("av")
        ).drop("av").join(
            alive.withColumnRenamed("v", "au"), F.col("u") == F.col("au")
        ).drop("au")
        degt = ea.groupBy("v").agg(
            F.count(F.lit(1)).cast("long").alias("d")
        )
        keep = (
            alive.join(degt, "v", "left")
            .where(F.coalesce("d", F.lit(0)) >= KCORE_K)
            .select("v")
            .localCheckpoint(eager=False)
        )
        rm = alive.join(keep, "v", "left_anti").select(
            "v", F.lit(t).cast("long").alias("removed_round")
        )
        removed = rm if removed is None else removed.unionAll(rm)
        alive = keep
    core = adj.join(
        alive.withColumnRenamed("v", "av"), F.col("v") == F.col("av")
    ).drop("av").join(
        alive.withColumnRenamed("v", "au"), F.col("u") == F.col("au")
    ).drop("au").groupBy("v").agg(
        F.count(F.lit(1)).cast("long").alias("core_deg")
    )
    return (
        ids.join(deg0, ids["doc_id"] == deg0["v"], "left").drop("v")
        .join(removed, ids["doc_id"] == removed["v"], "left").drop("v")
        .join(core, ids["doc_id"] == core["v"], "left").drop("v")
        .select(
            "doc_id",
            F.coalesce("deg0", F.lit(0).cast("long")).alias("deg0"),
            F.coalesce("removed_round", F.lit(0).cast("long")).alias(
                "removed_round"
            ),
            F.when(F.col("removed_round").isNull(), F.lit(1))
            .otherwise(F.lit(0))
            .cast("long")
            .alias("in_core"),
            F.coalesce("core_deg", F.lit(0).cast("long")).alias("core_deg"),
        )
    )


def _kcore_sql(
    outdeg: int = PR_OUTDEG, k: int = KCORE_K, peels: int = KCORE_PEELS
) -> str:
    """kcore oracle: the khop edge CTEs → unrolled synchronous peel
    rounds (per round: survivor-subgraph degree, >= k keep filter,
    EXCEPT for the removal set) → survivor core degree — all BIGINT,
    exact by construction."""
    parts = [f"""WITH ids AS (
  SELECT doc_id FROM documents
), nn AS (
  SELECT CAST(count(*) AS BIGINT) AS n FROM ids
), e0 AS (
  SELECT doc_id AS src,
         unnest(generate_series(0, {outdeg - 1})) AS j
  FROM ids
), e1 AS (
  SELECT src,
         ((((src * {outdeg} + j) % {KNUTH_P}) * {KNUTH_A}) % {KNUTH_P})
           % (SELECT n FROM nn) AS dst
  FROM e0
), e2 AS (
  SELECT src, dst FROM e1 WHERE dst <> src
), und AS (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
  FROM e2
), adj AS (
  SELECT a AS v, b AS u FROM und
  UNION ALL
  SELECT b AS v, a AS u FROM und
), deg0 AS (
  SELECT v, CAST(count(*) AS BIGINT) AS deg0 FROM adj GROUP BY 1
), a0 AS (
  SELECT doc_id AS v FROM ids
)"""]
    for t in range(1, peels + 1):
        parts.append(f""", d{t} AS (
  SELECT adj.v, CAST(count(*) AS BIGINT) AS d
  FROM adj
  JOIN a{t - 1} x ON adj.v = x.v
  JOIN a{t - 1} y ON adj.u = y.v
  GROUP BY 1
), a{t} AS (
  SELECT a{t - 1}.v FROM a{t - 1}
  JOIN d{t} ON a{t - 1}.v = d{t}.v
  WHERE d{t}.d >= {k}
), r{t} AS (
  SELECT v, CAST({t} AS BIGINT) AS removed_round FROM (
    SELECT v FROM a{t - 1} EXCEPT SELECT v FROM a{t})
)""")
    rm_union = "\n    UNION ALL\n    ".join(
        f"SELECT v, removed_round FROM r{t}" for t in range(1, peels + 1)
    )
    parts.append(f""", removed AS (
  SELECT v, removed_round FROM (
    {rm_union})
), core AS (
  SELECT adj.v, CAST(count(*) AS BIGINT) AS core_deg
  FROM adj
  JOIN a{peels} x ON adj.v = x.v
  JOIN a{peels} y ON adj.u = y.v
  GROUP BY 1
)
SELECT i.doc_id,
  CAST(coalesce(deg0.deg0, 0) AS BIGINT) AS deg0,
  CAST(coalesce(removed.removed_round, 0) AS BIGINT) AS removed_round,
  CAST(CASE WHEN removed.v IS NULL THEN 1 ELSE 0 END AS BIGINT) AS in_core,
  CAST(coalesce(core.core_deg, 0) AS BIGINT) AS core_deg
FROM ids i
LEFT JOIN deg0 ON i.doc_id = deg0.v
LEFT JOIN removed ON i.doc_id = removed.v
LEFT JOIN core ON i.doc_id = core.v
""")
    return "".join(parts)


# PCA power-iteration count / dim — mirrored in the unrolled oracle SQL.
PCA_ITERS = 3
PCA_DIM = 64


def q_source_centroid_sim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space cross-source similarity matrix — the audit that
    catches near-mirror SOURCES (not docs): for every source pair, the
    cosine between the sources' mean embeddings.  Token-space twins
    `source_kl` (unigram KL) and `source_overlap` (shared heads) read
    surface vocabulary; this reads the dense representation — two
    sources can share no head-shingles yet sit on top of each other in
    embedding space (same content, different boilerplate), and that is
    exactly the pair a mixture planner should not double-budget.
    doc_id == vec_id is the documents↔embeddings correspondence (the
    rrf_fusion convention).

    Cross-engine: per-(source, dim) means are e6-floor-rounded (the
    kmeans/PCA centroid discipline — floor(x*1e6+0.5)/1e6 on BOTH
    engines absorbs cross-row sum-order ulp); the pairwise cosine is
    computed over those identical rounded doubles with the dot/norm
    folds in index order on BOTH engines (the _embedding_pca textual
    expansion rule), shipped as the signed-safe e5 floor.  MIRRORED in
    the `source_centroid_sim` oracle SQL; change together.

    Scale shape: ONE PK equi-join (documents ⋈ embeddings on the id
    correspondence — co-partitioned/bucketed at corpus scale, the
    corpus_diff convention) into ONE 64-column partial agg ending at
    #sources rows; the pairwise sweep runs driver-side over that
    metadata-scale result (the oov_curve convention) — never a
    corpus-side cross join."""
    import math

    docs = _docs(spark, sf_dir).select("doc_id", "source")
    emb = _emb(spark, sf_dir)
    dim = PCA_DIM
    x = [F.element_at("embedding", k + 1).cast("double") for k in range(dim)]
    rows = (
        docs.join(emb, docs.doc_id == emb.vec_id)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            *[F.avg(x[k]).alias(f"m{k}") for k in range(dim)],
        )
        .collect()
    )
    cents = {
        r["source"]: (
            r["n"],
            [math.floor(r[f"m{k}"] * 1e6 + 0.5) / 1e6 for k in range(dim)],
        )
        for r in rows
    }
    out = []
    for sa in sorted(cents):
        for sb in sorted(cents):
            if sa >= sb:
                continue
            na, va = cents[sa]
            nb, vb = cents[sb]
            dot = aa = bb = 0.0
            for k in range(dim):
                dot += va[k] * vb[k]
                aa += va[k] * va[k]
                bb += vb[k] * vb[k]
            cos = dot / (math.sqrt(aa) * math.sqrt(bb))
            out.append(
                (sa, sb, int(na), int(nb), int(math.floor(cos * 1e5 + 0.5)))
            )
    return spark.createDataFrame(
        out,
        "source_a string, source_b string, n_a long, n_b long, cos_e5 long",
    )


def _source_centroid_sim_sql(dim: int = PCA_DIM) -> str:
    """source_centroid_sim oracle: per-source e6-floored per-dim means
    (the PCA mu discipline), pairwise cosine with every dot/norm sum
    expanded textually in index order so the FP addition order matches
    the Spark-side driver fold exactly."""
    mu_cols = ", ".join(
        f"floor(avg(emb[{k + 1}]) * 1000000 + 0.5) / 1000000 AS m{k}"
        for k in range(dim)
    )
    dot = " + ".join(f"a.m{k} * b.m{k}" for k in range(dim))
    aa = " + ".join(f"a.m{k} * a.m{k}" for k in range(dim))
    bb = " + ".join(f"b.m{k} * b.m{k}" for k in range(dim))
    return f"""
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
  FROM embeddings
), c AS (
  SELECT d.source, CAST(count(*) AS BIGINT) AS n, {mu_cols}
  FROM documents d JOIN e ON d.doc_id = e.vec_id
  GROUP BY d.source
)
SELECT a.source AS source_a, b.source AS source_b,
       a.n AS n_a, b.n AS n_b,
       CAST(floor(({dot}) / (sqrt({aa}) * sqrt({bb})) * 100000 + 0.5)
            AS BIGINT) AS cos_e5
FROM c a JOIN c b ON a.source < b.source
"""


def q_embedding_pca(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-principal-component projection of the embedding store —
    the dimensionality-reduction step a curation pipeline runs before
    clustering/visualization — via DETERMINISTIC power iteration, and
    (as with `kmeans`) the training loop itself is value-hash-checked
    by an unrolled SQL mirror.

    Method: center on the 6-dp-rounded per-dim mean (one agg; the
    rounding makes μ bit-identical cross-engine), start from the
    uniform unit vector, then ``PCA_ITERS`` × [one agg pass computing
    s_j = Σ_i d_i·(x_ij-μ_j) with d_i = (x_i-μ)·v, normalize, round
    components to 6 dp, flip so c1 ≥ 0].  Per-row dot products are
    left-to-right folds in index order on BOTH engines, so every d_i
    is computed on identical doubles; cross-row sum-order noise is
    absorbed by the 6-dp round exactly like the kmeans means.  Output
    is the per-vector projection (x-μ)·v, floor-stable-rounded to 5 dp
    (signed-safe form).

    Scale shape: dim-column agg passes (bounded output) + pure per-row
    maps — no shuffle of the corpus beyond one partial agg per
    iteration; v and μ travel as literals."""
    import math

    emb = _emb(spark, sf_dir)
    dim = PCA_DIM
    x = [F.element_at("embedding", j + 1).cast("double") for j in range(dim)]
    mu_row = emb.agg(
        *[F.avg(x[j]).alias(f"m{j}") for j in range(dim)]
    ).collect()[0]
    mu = [math.floor(mu_row[f"m{j}"] * 1e6 + 0.5) / 1e6 for j in range(dim)]
    c = [x[j] - F.lit(mu[j]) for j in range(dim)]

    def dot_v(v: list[float]):
        d = c[0] * F.lit(v[0])
        for j in range(1, dim):
            d = d + c[j] * F.lit(v[j])
        return d

    v = [0.125] * dim
    for _ in range(PCA_ITERS):
        d = dot_v(v)
        srow = emb.agg(
            *[F.sum(d * c[j]).alias(f"s{j}") for j in range(dim)]
        ).collect()[0]
        s = [srow[f"s{j}"] for j in range(dim)]
        norm = math.sqrt(sum(t * t for t in s))
        v = [math.floor(s[j] / norm * 1e6 + 0.5) / 1e6 for j in range(dim)]
        if v[0] < 0:
            v = [-t for t in v]

    pc1 = F.floor(dot_v(v) * F.lit(100000.0) + F.lit(0.5)) / F.lit(100000.0)
    return emb.select("vec_id", "label", pc1.alias("pc1"))


def _embedding_pca_sql(dim: int = PCA_DIM, iters: int = PCA_ITERS) -> str:
    """Unrolled power iteration mirroring q_embedding_pca exactly:
    6-dp-rounded mean, uniform start vector, per-iteration
    (sum → normalize → 6-dp round → sign-flip on c1), 5-dp
    floor-stable projection.  All dot products expand textually in
    index order so the FP addition order matches the Spark fold."""
    mu_cols = ", ".join(
        f"floor(avg(emb[{j + 1}]) * 1000000 + 0.5) / 1000000 AS m{j + 1}"
        for j in range(dim)
    )
    parts = [
        f"""e AS (
  SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
  FROM embeddings
), mu AS (
  SELECT {mu_cols} FROM e
)"""
    ]

    def d_expr(vref) -> str:
        return " + ".join(
            f"(e.emb[{j + 1}] - mu.m{j + 1}) * {vref(j)}" for j in range(dim)
        )

    prev = None
    for it in range(1, iters + 1):
        if prev is None:
            vref = lambda j: "0.125"  # noqa: E731
            extra = ""
        else:
            vref = lambda j, p=prev: f"{p}.c{j + 1}"  # noqa: E731
            extra = f", {prev}"
        sums = ", ".join(
            f"sum(t.d * (t.emb[{j + 1}] - mu.m{j + 1})) AS s{j + 1}"
            for j in range(dim)
        )
        norm = " + ".join(f"s{j + 1} * s{j + 1}" for j in range(dim))
        comps = ", ".join(
            f"floor(s{j + 1} / nrm * 1000000 + 0.5) / 1000000 AS c{j + 1}"
            for j in range(dim)
        )
        flipped = ", ".join(f"sgn * c{j + 1} AS c{j + 1}" for j in range(dim))
        parts.append(
            f"""it{it} AS (
  SELECT {sums}
  FROM (SELECT e.emb, {d_expr(vref)} AS d FROM e, mu{extra}) t, mu
), n{it} AS (
  SELECT *, sqrt({norm}) AS nrm FROM it{it}
), vr{it} AS (
  SELECT {comps} FROM n{it}
), v{it} AS (
  SELECT {flipped}
  FROM (SELECT *, CASE WHEN c1 < 0 THEN -1.0 ELSE 1.0 END AS sgn FROM vr{it})
)"""
        )
        prev = f"v{it}"
    final_d = d_expr(lambda j: f"{prev}.c{j + 1}")
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
SELECT e.vec_id, e.label,
       floor(({final_d}) * 100000 + 0.5) / 100000 AS pc1
FROM e, mu, {prev}
"""
    )


# --- epoch shuffle / sharding -------------------------------------------------

# Shard count for the deterministic epoch shuffle — mirrored in the
# `shuffle_shards` oracle SQL; change together.
SHUFFLE_N_SHARDS = 16


def q_shuffle_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic epoch shuffle + shard assignment — the step that
    turns a curated corpus into a training-order dataset: every doc
    gets a pseudo-random order key (`knuth_hash`, the ANSI-safe
    multiplicative hash — xxh3 would defeat the SQL oracle), a shard
    (key mod ``SHUFFLE_N_SHARDS``), and its 0-based position within
    the shard ordered by (key, doc_id).  Same-seed runs reproduce the
    exact order — the property training jobs need for resumable
    epochs and for the reference's deterministic routing analog
    (F16 shard key, /root/reference/internal/core/router.go route
    hashing re-expressed over docs instead of domains).

    Scale shape: ONE exchange hash-partitioned on shard + an
    in-partition sort (Exchange+Sort+Window — never a global sort);
    at 10^12 rows this is exactly repartition(S) +
    sortWithinPartitions with one writer file per shard.  Plan-locked
    to a single exchange and zero UDFs in tests/test_plans.py."""
    from pyspark.sql.window import Window

    docs = _docs(spark, sf_dir).select("doc_id")
    key = knuth_hash(F.col("doc_id"))
    keyed = docs.select(
        "doc_id",
        key.alias("order_key"),
        (key % F.lit(SHUFFLE_N_SHARDS)).alias("shard"),
    )
    w = Window.partitionBy("shard").orderBy("order_key", "doc_id")
    return keyed.select(
        "doc_id",
        F.col("shard").cast("long").alias("shard"),
        (F.row_number().over(w) - 1).cast("long").alias("pos"),
        F.col("order_key").cast("long").alias("order_key"),
    )


def _shuffle_shards_sql() -> str:
    return f"""
WITH k AS (
  SELECT doc_id,
         ((doc_id % {KNUTH_P}) * {KNUTH_A}) % {KNUTH_P} AS order_key
  FROM documents
)
SELECT doc_id,
       CAST(order_key % {SHUFFLE_N_SHARDS} AS BIGINT) AS shard,
       CAST(row_number() OVER (PARTITION BY order_key % {SHUFFLE_N_SHARDS}
                               ORDER BY order_key, doc_id) - 1
            AS BIGINT) AS pos,
       CAST(order_key AS BIGINT) AS order_key
FROM k
"""


# Holdout-split constants — MIRRORED in `_holdout_split_sql`; change
# together.  hash-permille >= TEST_FROM → test, >= VAL_FROM → val.
HOLDOUT_VAL_FROM = 980
HOLDOUT_TEST_FROM = 990


def q_holdout_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test holdout split — the step every
    training-data pipeline runs before packing: assignment is a pure
    function of doc_id (knuth-hash permille against fixed thresholds),
    so membership is stable under re-runs, repartitioning, and
    incremental corpus growth (a doc never migrates between splits
    when new data arrives — the property random sampling lacks).
    Output is the per-(split, lang) audit summary: doc count, token
    sum, and a doc_id checksum that pins the exact membership.

    Scale shape: pure per-row map + ONE partial-agg exchange to a
    (3 × #langs)-row summary; the split column itself costs nothing
    at write time (it is a partition key, not a shuffle).  The
    checksum is bit_xor of the hash values — overflow-free at any row
    count (a SUM of ~1e9-scale hashes breaks int64 past ~1e10 rows)."""
    docs = _docs(spark, sf_dir)
    permille = knuth_hash(F.col("doc_id")) % 1000
    split = (
        F.when(permille >= HOLDOUT_TEST_FROM, F.lit("test"))
        .when(permille >= HOLDOUT_VAL_FROM, F.lit("val"))
        .otherwise(F.lit("train"))
    )
    return (
        docs.select(
            split.alias("split"),
            "lang",
            token_count().alias("n_tok"),
            knuth_hash(F.col("doc_id")).alias("kh"),
        )
        .groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tok").cast("long").alias("n_tokens"),
            F.expr("bit_xor(kh)").cast("long").alias("id_checksum"),
        )
    )


def _holdout_split_sql() -> str:
    tc = (
        "CASE WHEN trim(text) = '' THEN 0 ELSE len(regexp_split_to_array("
        "trim(text), '[ \\t\\n\\x0B\\f\\r]+')) END"
    )
    kh = f"((doc_id % {KNUTH_P}) * {KNUTH_A}) % {KNUTH_P}"
    return f"""
WITH d AS (
  SELECT doc_id, lang, {tc} AS n_tok,
         CASE WHEN ({kh}) % 1000 >= {HOLDOUT_TEST_FROM} THEN 'test'
              WHEN ({kh}) % 1000 >= {HOLDOUT_VAL_FROM} THEN 'val'
              ELSE 'train' END AS split
  FROM documents
)
SELECT split, lang, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tok) AS BIGINT) AS n_tokens,
       CAST(bit_xor({kh}) AS BIGINT) AS id_checksum
FROM d GROUP BY 1, 2
"""


def q_lm_eval_holdout(
    spark: SparkSession, sf_dir: str, vocab_k: int | None = None
) -> DataFrame:
    """Held-out LM evaluation — the eval-harness step a pretraining
    pipeline runs to monitor data quality: the bigram LM is trained on
    the TRAIN split ONLY (the `holdout_split` knuth-permille rule) and
    then scores every document, so val/test rows carry genuinely
    held-out fluency scores (the model never saw them) and their OOV
    rates read the train/eval distribution gap.  Composes
    `holdout_split` × `bigram_lm_score` into the shape of a perplexity
    eval (Paloma-style, reduced to the repo's deterministic bigram
    reference model).

    Cross-engine: the split is the exact integer permille rule; vocab
    counts come only from train docs (identical c2/c1 rationals both
    engines); scoring is the bigram_lm_score contract — per-row fold
    vs SQL group-sum, absorbed by the 3-dp stable rounding.

    Scale shape: two bounded train-side hash aggs ship the vocab back
    as a literal map; scoring + split assignment are a pure per-row
    map — zero exchanges, no token explode (the bigram_lm_score
    plan)."""
    if vocab_k is None:  # BIGRAM_VOCAB_K is defined later in the module
        vocab_k = BIGRAM_VOCAB_K
    docs = _docs(spark, sf_dir).select("doc_id", "text")
    permille = knuth_hash(F.col("doc_id")) % 1000
    vocab = _bigram_vocab(
        docs.where(permille < HOLDOUT_VAL_FROM), vocab_k
    )
    split = (
        F.when(permille >= HOLDOUT_TEST_FROM, F.lit("test"))
        .when(permille >= HOLDOUT_VAL_FROM, F.lit("val"))
        .otherwise(F.lit("train"))
    )
    lp_map = F.create_map(*[F.lit(x) for kv in vocab.items() for x in kv])
    bi = _bigrams()
    lp = F.transform(bi, lambda b: lp_map[b])
    in_vocab = F.filter(lp, lambda x: x.isNotNull())
    n_in = F.size(in_vocab)
    avg_lp = F.aggregate(in_vocab, F.lit(0.0), lambda a, x: a + x) / n_in.cast(
        "double"
    )
    return docs.where(F.trim("text") != "").select(
        "doc_id",
        split.alias("split"),
        F.size(bi).cast("long").alias("n_bigrams"),
        (F.size(bi) - n_in).cast("long").alias("n_oov"),
        F.when(n_in > 0, round3_stable(avg_lp)).alias("avg_logprob"),
    )


# Data-scaling-curve constants — MIRRORED in `_data_scaling_sql`;
# change together.  Nested train subsets are sel-permille < thr with
# sel = knuth_hash(doc_id + SCALE_SALT) % 1000, so selection is
# independent of the holdout split permille and 25% ⊂ 50% ⊂ 100%.
SCALE_FRACS = (250, 500, 1000)
SCALE_SALT = 13


def q_data_scaling_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source data-scaling probe (the datablations-/Hoffmann-style
    question applied to curation: WHICH source still improves when you
    give the model more data?): train the bigram reference LM on
    nested 25% / 50% / 100% subsets of the train split, score the
    SAME held-out eval docs each time, and emit the per-(source,
    fraction) held-out loss curve.  A source whose held-out logprob
    keeps climbing from 25%→100% earns more budget in the mixture
    (`temperature_mix` / `doremi_weights` consume exactly this kind of
    evidence); a flat curve says the source is saturated.

    Cross-engine: subsets by the exact integer sel-permille rule (a
    SALTED knuth hash so selection ⊥ the holdout split); each vocab is
    the `_bigram_vocab` contract on its subset; per-doc scores ship as
    the e3-floored BIGINT avg logprob (the ccnet/doremi e3-LM-floor
    discipline — division before floor absorbs fold-vs-group-sum
    order noise) and every per-source output is a BIGINT count or sum.

    Scale shape: per fraction, TWO bounded vocab hash aggs (literal
    map back) + one pure-map scoring pass over the eval split only
    (2% of the corpus) ending in a ≤|sources|-row agg — the
    lm_eval_holdout plan, three times; output is |sources|×3 rows."""
    docs = _docs(spark, sf_dir).select("doc_id", "text", "source")
    pm = knuth_hash(F.col("doc_id")) % 1000
    sel = knuth_hash(F.col("doc_id") + SCALE_SALT) % 1000
    train = docs.where(pm < HOLDOUT_VAL_FROM)
    eval_docs = docs.where(pm >= HOLDOUT_VAL_FROM).where(
        F.trim("text") != ""
    )
    bi = _bigrams()
    parts = []
    for thr in SCALE_FRACS:
        vocab = _bigram_vocab(train.where(sel < thr), BIGRAM_VOCAB_K)
        lp_map = F.create_map(
            *[F.lit(x) for kv in vocab.items() for x in kv]
        )
        lp = F.transform(bi, lambda b: lp_map[b])
        in_vocab = F.filter(lp, lambda x: x.isNotNull())
        n_in = F.size(in_vocab)
        avg_lp = F.aggregate(
            in_vocab, F.lit(0.0), lambda a, x: a + x
        ) / n_in.cast("double")
        lp_e3 = F.floor(avg_lp * F.lit(1000.0) + F.lit(0.5)).cast("long")
        per_doc = eval_docs.select(
            "source",
            F.size(bi).cast("long").alias("n_bg"),
            n_in.cast("long").alias("n_in"),
            F.when(n_in > 0, lp_e3).alias("lp_e3"),
        )
        parts.append(
            per_doc.groupBy("source").agg(
                F.lit(thr).cast("long").alias("frac_permille"),
                F.count(F.lit(1)).cast("long").alias("n_eval"),
                F.sum((F.col("n_in") > 0).cast("long"))
                .cast("long")
                .alias("n_scored"),
                F.coalesce(F.sum("lp_e3"), F.lit(0))
                .cast("long")
                .alias("sum_lp_e3"),
                F.sum(F.col("n_bg") - F.col("n_in"))
                .cast("long")
                .alias("sum_oov"),
                F.sum("n_bg").cast("long").alias("sum_bigrams"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out.select(
        "source",
        "frac_permille",
        "n_eval",
        "n_scored",
        "sum_lp_e3",
        "sum_oov",
        "sum_bigrams",
    )


# RHO-loss selection constant — MIRRORED in `_rho_loss_sql`; change
# together.  Top-k of the reducible-holdout-loss score.
RHO_TOPK = 100


def q_rho_loss_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RHO-loss data selection (Mindermann et al., ICML 2022 —
    "prioritize points that are learnable, worth learning, and not
    yet learnt"): score every TRAIN doc under two reference models —
    one trained on the train split (the "current model" loss) and
    one trained on the held-out val split (the irreducible-loss
    model) — and keep the top-k by reducible holdout loss
    loss_train − loss_holdout = lp_holdout_e3 − lp_train_e3.  A doc
    the current model finds hard but the holdout model finds easy is
    learnable signal; hard under BOTH is noise and scores ~0.
    Completes the selection family next to DSIR (distribution match),
    EL2N (gradient magnitude) and D4 (redundancy).

    Cross-engine: the split is the holdout knuth-permille rule; both
    vocabs are the `_bigram_vocab` contract on their split; per-doc
    scores are the e3-floored BIGINT avg logprob (the data_scaling /
    ccnet e3-LM-floor discipline), so rho is an exact BIGINT
    difference; only docs scoreable under BOTH models rank
    (deterministic rule, mirrored), tie-break (rho DESC, doc_id).

    Scale shape: four bounded vocab hash aggs ship two literal maps;
    scoring is a pure per-row map over the train split and the
    selection is orderBy+limit at fixed k=RHO_TOPK — plans as
    TakeOrderedAndProject (per-partition top-k + driver merge of
    k-row slices), never a global sort."""
    docs = _docs(spark, sf_dir).select("doc_id", "text")
    pm = knuth_hash(F.col("doc_id")) % 1000
    train = docs.where(pm < HOLDOUT_VAL_FROM)
    val = docs.where(
        (pm >= HOLDOUT_VAL_FROM) & (pm < HOLDOUT_TEST_FROM)
    )
    bi = _bigrams()
    per_model = {}
    for name, subset in (("train", train), ("holdout", val)):
        vocab = _bigram_vocab(subset, BIGRAM_VOCAB_K)
        lp_map = F.create_map(
            *[F.lit(x) for kv in vocab.items() for x in kv]
        )
        lp = F.transform(bi, lambda b: lp_map[b])
        in_vocab = F.filter(lp, lambda x: x.isNotNull())
        n_in = F.size(in_vocab)
        avg_lp = F.aggregate(
            in_vocab, F.lit(0.0), lambda a, x: a + x
        ) / n_in.cast("double")
        lp_e3 = F.floor(avg_lp * F.lit(1000.0) + F.lit(0.5)).cast("long")
        per_model[name] = (n_in, lp_e3)
    n_t, lp_t = per_model["train"]
    n_h, lp_h = per_model["holdout"]
    scored = (
        train.where(F.trim("text") != "")
        .where((n_t > 0) & (n_h > 0))
        .select(
            "doc_id",
            lp_t.alias("lp_train_e3"),
            lp_h.alias("lp_holdout_e3"),
        )
        .withColumn(
            "rho_e3", F.col("lp_holdout_e3") - F.col("lp_train_e3")
        )
    )
    return scored.orderBy(F.col("rho_e3").desc(), "doc_id").limit(RHO_TOPK)


# --- token-budget / epoch planner -----------------------------------------------

# UniMax-style planner constants — MIRRORED in `_token_budget_sql`;
# change together.  Budget = floor(total * NUM / DEN) tokens; each
# (lang, source) stratum is capped at PLAN_MAX_EPOCHS passes over its
# available tokens.
TOKEN_BUDGET_NUM = 3
TOKEN_BUDGET_DEN = 2
PLAN_MAX_EPOCHS = 2


def q_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget / epoch planner: given per-(lang, source) available
    token counts, allocate a fixed training budget uniformly across
    strata subject to an epoch cap — the UniMax sampling rule (Chung
    et al. 2023, "UniMax: Fairer and More Effective Language
    Sampling"), which prevents over-repeating small languages while
    spending the whole budget.  This is the planning step between
    corpus curation and `shuffle_shards`: its output (per-stratum
    token allocations and epoch counts) parameterizes the sampler.

    The iterative water-filling loop has an exact closed form over the
    cap-sorted strata: with caps ascending, stratum i is capped iff
    cap_i * (L - i + 1) + cumcap_{<i} < B (the condition is monotone,
    so the capped set is a prefix), and every uncapped stratum gets an
    equal share of the remaining budget.  All comparisons are BIGINT —
    no float in the branch decision — so Spark and DuckDB agree
    exactly; the fractional share and epoch ratio are single IEEE
    divisions, floor-stable-rounded per CLAUDE.md discipline.

    Scale shape: ONE exchange (the per-stratum partial agg); the
    window pass runs over the strata table, which is metadata-scale
    (#langs × #sources — thousands, not rows), the same bounded-
    summary-then-plan shape as `quality_quantile_gate_approx`.  No
    reference analog (the reference curates, never plans training
    epochs); this is the training-data-pipeline extension."""
    from pyspark.sql.window import Window

    docs = _docs(spark, sf_dir)
    avail = docs.groupBy("lang", "source").agg(
        F.sum(token_count()).cast("long").alias("avail_tokens")
    )
    caps = avail.select(
        "lang",
        "source",
        "avail_tokens",
        (F.col("avail_tokens") * PLAN_MAX_EPOCHS)
        .cast("long")
        .alias("cap_tokens"),
    )
    # strata table is metadata-scale: a single-partition window is the
    # whole point (bounded summary on the driver-side of the plan).
    order = Window.orderBy("cap_tokens", "lang", "source")
    unb = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    flagged = caps.select(
        "*",
        F.row_number().over(order).alias("rn"),
        F.coalesce(
            F.sum("cap_tokens").over(
                order.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        )
        .cast("long")
        .alias("cum_excl"),
        F.count(F.lit(1)).over(unb).cast("long").alias("n_strata"),
        F.sum("avail_tokens").over(unb).cast("long").alias("total"),
    ).withColumn(
        "budget",
        F.expr(
            f"CAST((total * {TOKEN_BUDGET_NUM}) DIV {TOKEN_BUDGET_DEN} AS BIGINT)"
        ),
    ).withColumn(
        "capped",
        (
            F.col("cap_tokens") * (F.col("n_strata") - F.col("rn") + 1)
            + F.col("cum_excl")
            < F.col("budget")
        ).cast("long"),
    )
    planned = flagged.select(
        "*",
        F.sum(F.when(F.col("capped") == 1, F.col("cap_tokens")).otherwise(0))
        .over(unb)
        .cast("long")
        .alias("capped_sum"),
        F.sum("capped").over(unb).cast("long").alias("n_capped"),
    )
    n_uncapped = F.col("n_strata") - F.col("n_capped")
    share = (F.col("budget") - F.col("capped_sum")).cast("double") / n_uncapped.cast(
        "double"
    )
    alloc = (
        F.when(F.col("capped") == 1, F.col("cap_tokens"))
        .when(n_uncapped == 0, F.col("cap_tokens"))
        .otherwise(F.floor(share))
        .cast("long")
    )
    return planned.select(
        "lang",
        "source",
        "avail_tokens",
        "cap_tokens",
        alloc.alias("alloc_tokens"),
        round5_stable(
            alloc.cast("double") / F.col("avail_tokens").cast("double")
        ).alias("epochs"),
        F.col("capped").alias("capped"),
    )


def _token_budget_ctes() -> str:
    """The planner CTE chain (avail .. alloced) shared verbatim by the
    `token_budget` and `unimax_sample` oracles — mirrors
    q_token_budget's closed-form water-filling exactly."""
    tc = (
        "CASE WHEN trim(text) = '' THEN 0 ELSE len(regexp_split_to_array("
        "trim(text), '[ \\t\\n\\x0B\\f\\r]+')) END"
    )
    return f"""avail AS (
  SELECT lang, source, CAST(SUM({tc}) AS BIGINT) AS avail_tokens
  FROM documents GROUP BY 1, 2
), caps AS (
  SELECT lang, source, avail_tokens,
         CAST(avail_tokens * {PLAN_MAX_EPOCHS} AS BIGINT) AS cap_tokens
  FROM avail
), flagged AS (
  SELECT *,
    ROW_NUMBER() OVER (ORDER BY cap_tokens, lang, source) AS rn,
    CAST(COALESCE(SUM(cap_tokens) OVER (
        ORDER BY cap_tokens, lang, source
        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
      AS cum_excl,
    CAST(COUNT(*) OVER () AS BIGINT) AS n_strata,
    CAST(SUM(avail_tokens) OVER () AS BIGINT) AS total
  FROM caps
), budgeted AS (
  SELECT *,
    CAST((total * {TOKEN_BUDGET_NUM}) // {TOKEN_BUDGET_DEN} AS BIGINT)
      AS budget,
    CASE WHEN cap_tokens * (n_strata - rn + 1) + cum_excl
              < (total * {TOKEN_BUDGET_NUM}) // {TOKEN_BUDGET_DEN}
         THEN 1 ELSE 0 END AS capped
  FROM flagged
), planned AS (
  SELECT *,
    CAST(SUM(CASE WHEN capped = 1 THEN cap_tokens ELSE 0 END) OVER ()
         AS BIGINT) AS capped_sum,
    CAST(SUM(capped) OVER () AS BIGINT) AS n_capped
  FROM budgeted
), alloced AS (
  SELECT *,
    CAST(CASE WHEN capped = 1 THEN cap_tokens
              WHEN n_strata - n_capped = 0 THEN cap_tokens
              ELSE floor((budget - capped_sum)::DOUBLE
                         / (n_strata - n_capped)::DOUBLE) END
         AS BIGINT) AS alloc_tokens
  FROM planned
)"""


def _token_budget_sql() -> str:
    return f"""
WITH {_token_budget_ctes()}
SELECT lang, source, avail_tokens, cap_tokens, alloc_tokens,
       floor(alloc_tokens::DOUBLE / avail_tokens::DOUBLE * 1e5 + 0.5) / 1e5
         AS epochs,
       CAST(capped AS BIGINT) AS capped
FROM alloced
"""


# Partial-epoch hash threshold resolution — MIRRORED in
# `_unimax_sample_sql`; change together.
UNIMAX_HASH_MOD = 1_000_000


def q_unimax_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epoch-expansion sampler — CONSUMES the `token_budget` plan and
    emits what the training dataloader actually reads: per-document
    repeat counts.  A stratum allocated `alloc` tokens over `avail`
    available runs f = alloc DIV avail full epochs, plus a partial
    epoch holding the hash-selected share of documents whose expected
    token mass is the remainder: doc joins the partial epoch iff
    knuth_hash(doc_id) % 10^6 < floor(partial * 10^6 / avail).

    Why a hash threshold and not an exact token-prefix: the exact rule
    is a per-stratum cumulative sum — a window partitioned by (lang,
    source), and with ~10^2 strata over 10^12 docs one dominant
    language funnels the whole corpus through a handful of partitions
    (the skew failure `span_dedup` avoids by keying on span text).
    The threshold form is a PURE MAP: same determinism, same
    membership stability under growth (the `holdout_split` argument),
    token budget met in expectation with hash-uniform error.  The
    threshold itself is computed driver-side in exact Python integers
    (partial * 10^6 overflows int64 at 10^13-token strata, so the
    Spark plan must not compute it; the DuckDB oracle mirror only ever
    runs at test scale).

    Scale shape: ONE corpus exchange (the planner's per-stratum agg) +
    a broadcast join of the bounded plan + pure map.  n_repeats <=
    PLAN_MAX_EPOCHS structurally: f = MAX_EPOCHS forces partial = 0,
    so the threshold term is 0."""
    plan = q_token_budget(spark, sf_dir).collect()  # metadata-scale
    rows = []
    for r in plan:
        avail, alloc = int(r["avail_tokens"]), int(r["alloc_tokens"])
        f = alloc // avail if avail else 0
        partial = alloc - f * avail
        thr = partial * UNIMAX_HASH_MOD // avail if avail else 0
        rows.append((r["lang"], r["source"], f, thr))
    pdf = spark.createDataFrame(
        rows, "lang string, source string, f long, thr long"
    )
    docs = _docs(spark, sf_dir)
    khm = knuth_hash(F.col("doc_id")) % UNIMAX_HASH_MOD
    return (
        docs.select(
            "doc_id",
            "lang",
            "source",
            token_count().cast("long").alias("n_tok"),
            khm.alias("khm"),
        )
        .join(F.broadcast(pdf), ["lang", "source"])
        .select(
            "doc_id",
            "lang",
            "source",
            "n_tok",
            (F.col("f") + (F.col("khm") < F.col("thr")).cast("long")).alias(
                "n_repeats"
            ),
        )
    )


def _unimax_sample_sql() -> str:
    tc = (
        "CASE WHEN trim(text) = '' THEN 0 ELSE len(regexp_split_to_array("
        "trim(text), '[ \\t\\n\\x0B\\f\\r]+')) END"
    )
    kh = f"((doc_id % {KNUTH_P}) * {KNUTH_A}) % {KNUTH_P}"
    m = UNIMAX_HASH_MOD
    return f"""
WITH {_token_budget_ctes()},
plan AS (
  SELECT lang, source,
    CASE WHEN avail_tokens = 0 THEN 0
         ELSE alloc_tokens // avail_tokens END AS f,
    CASE WHEN avail_tokens = 0 THEN 0
         ELSE ((alloc_tokens - (alloc_tokens // avail_tokens) * avail_tokens)
               * {m}) // avail_tokens END AS thr
  FROM alloced
), d AS (
  SELECT doc_id, lang, source, CAST({tc} AS BIGINT) AS n_tok,
         ({kh}) % {m} AS khm
  FROM documents
)
SELECT d.doc_id, d.lang, d.source, d.n_tok,
       CAST(p.f + CASE WHEN d.khm < p.thr THEN 1 ELSE 0 END AS BIGINT)
         AS n_repeats
FROM d JOIN plan p USING (lang, source)
"""


# --- distributed classifier training -------------------------------------------

# Logistic-regression training constants — baked into the unrolled
# `_logreg_sql` oracle; change together.
LOGREG_ITERS = 5
LOGREG_LR = 0.5


def logreg_features(docs: DataFrame) -> DataFrame:
    """The (x1, x2, x3, y) feature/label projection q_logreg_quality
    trains on — a pure map over docs (plan-locked in test_plans.py:
    its gradient agg is one partial-agg exchange, join/window/UDF
    free)."""
    feats = quality_features()
    return docs.select(
        "doc_id",
        feats["alpha_ratio"].alias("x1"),
        F.least(feats["n_chars"] / F.lit(500.0), F.lit(1.0)).alias("x2"),
        feats["punct_ratio"].alias("x3"),
        F.when(lang_guess() == "en", F.lit(1.0))
        .otherwise(F.lit(0.0))
        .alias("y"),
    )


def q_logreg_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed logistic-regression training as a first-class
    operator — the quality-classifier step of a curation pipeline
    (a fastText-style doc classifier reduced to its distributed
    core: full-batch gradient descent over doc features), and as
    with `kmeans` and `embedding_pca` the TRAINING LOOP itself is
    value-hash-checked against an unrolled SQL mirror.

    Features per doc — identical rational doubles on both engines:
    x1 = alpha_ratio, x2 = min(n_chars/500, 1), x3 = punct_ratio,
    plus bias; label y = [lang_guess == 'en'].  ``LOGREG_ITERS``
    GD steps at lr ``LOGREG_LR``: per-step mean-gradient components
    and the pre-update mean log-loss are rounded 6-dp STABLE (floor
    form, the kmeans-means discipline) so cross-engine exp()/ln()
    ulp noise and sum-order drift (~1e-12 absolute) cannot move
    them; the weight recurrence w -= lr*g then evolves as identical
    doubles on both engines.  Emits (it, j, w, loss) per step — the
    monotone loss column is the training-progress proof.

    Scale shape: one 5-scalar hash agg per iteration over a pure-map
    feature projection (the kmeans loop shape — no explode, no join,
    no window; plan-locked 0 extra exchanges); weights travel as
    literals; driver state is 4 floats."""
    fx = logreg_features(_docs(spark, sf_dir))
    rows, _ = _logreg_train(fx)
    return spark.createDataFrame(rows, "it long, j long, w double, loss double")


def _logreg_train(fx: DataFrame) -> tuple[list[tuple], list[float]]:
    """The full-batch GD loop shared by training and inference:
    returns the per-step (it, j, w, loss) rows and the final weight
    vector.  See q_logreg_quality for the cross-engine contract."""
    import math

    xs = [F.lit(1.0), F.col("x1"), F.col("x2"), F.col("x3")]
    wv = [0.0, 0.0, 0.0, 0.0]
    rows = []
    for it in range(1, LOGREG_ITERS + 1):
        # fold order (((w0*1 + w1*x1) + w2*x2) + w3*x3) mirrors the SQL
        # text exactly — both engines add in the same IEEE order
        m = (
            F.lit(wv[0]) * xs[0]
            + F.lit(wv[1]) * xs[1]
            + F.lit(wv[2]) * xs[2]
            + F.lit(wv[3]) * xs[3]
        )
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-m))
        err = p - F.col("y")
        agg = fx.agg(
            *[F.sum(err * xs[j]).alias(f"g{j}") for j in range(4)],
            F.sum(
                -(
                    F.col("y") * F.log(p)
                    + (F.lit(1.0) - F.col("y")) * F.log(F.lit(1.0) - p)
                )
            ).alias("l"),
            F.count(F.lit(1)).alias("n"),
        ).collect()[0]
        n = float(agg["n"])
        g = [
            math.floor(agg[f"g{j}"] / n * 1e6 + 0.5) / 1e6 for j in range(4)
        ]
        loss = math.floor(agg["l"] / n * 1e6 + 0.5) / 1e6
        wv = [wv[j] - LOGREG_LR * g[j] for j in range(4)]
        rows += [(it, j, wv[j], loss) for j in range(4)]
    return rows, wv


def q_logreg_infer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier INFERENCE — the serve side of `logreg_quality`'s
    train side: retrain the deterministic GD weights, then score every
    document with the final weight vector as literals.  Emits per doc
    the 5-dp stable-rounded margin, the decision pred_en = [margin >=
    0] (the sign test avoids exp() in per-row output — the margin is
    pure arithmetic on identical doubles cross-engine, so the decision
    boundary cannot flake), and the label for downstream accuracy
    audits.

    Scale shape: training is the bounded per-iteration agg loop
    (weights are 4 driver floats); scoring is a pure map with ZERO
    exchanges — the exact shape a 100-TB quality-filter pass needs."""
    fx = logreg_features(_docs(spark, sf_dir))
    _, wv = _logreg_train(fx)
    m = (
        F.lit(wv[0]) * F.lit(1.0)
        + F.lit(wv[1]) * F.col("x1")
        + F.lit(wv[2]) * F.col("x2")
        + F.lit(wv[3]) * F.col("x3")
    )
    return fx.select(
        "doc_id",
        round5_stable(m).alias("margin"),
        (m >= 0).cast("long").alias("pred_en"),
        F.col("y").cast("long").alias("label"),
    )


# EL2N keep fraction (exact-integer pair) — MIRRORED in the
# `el2n_prune` oracle SQL's k = greatest(1, n*NUM DIV DEN).
EL2N_KEEP_NUM = 1
EL2N_KEEP_DEN = 2


def q_el2n_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EL2N data pruning (Paul et al. 2021, "Deep Learning on a Data
    Diet") — keep the hardest examples by early-training error norm;
    with the repo's logistic quality classifier the EL2N score reduces
    to |p - y| under the trained weights.  Completes the data-pruning
    canon alongside `semantic_dedup` (redundancy), `proto_prune`
    (prototypicality), `d4_prune` (both) and `dsir_topfrac`
    (distribution matching): this one prunes by LEARNING signal.

    Cross-engine: weights retrain via the shared deterministic GD
    (`_logreg_train` == the unrolled `_logreg_ctes` chain); the score
    ships as the e3-floored BIGINT floor(|p - y|*1e3 + 0.5) — exp()
    appears once per row and the e3 floor absorbs engine exp() ulp
    drift (the avg_logprob/dsir_weight discipline).  Selection is the
    hardest ``EL2N_KEEP_NUM/DEN`` fraction via the bounded-histogram
    exact top-frac (`dsir_select_top_frac` — el2n/1000 is a stable
    1e-3 multiple, its contract), bit-identical to
    orderBy(desc(score), doc_id).limit(k) without a corpus-sized
    driver merge.

    Scale shape: training is the bounded per-iteration agg loop;
    scoring is a pure map; selection is one ≤1001-bucket histogram
    agg + a pure-map filter + a one-bucket top-up."""
    fx = logreg_features(_docs(spark, sf_dir))
    _, wv = _logreg_train(fx)
    m = (
        F.lit(wv[0]) * F.lit(1.0)
        + F.lit(wv[1]) * F.col("x1")
        + F.lit(wv[2]) * F.col("x2")
        + F.lit(wv[3]) * F.col("x3")
    )
    p = F.lit(1.0) / (F.lit(1.0) + F.exp(-m))
    e3 = F.floor(F.abs(p - F.col("y")) * F.lit(1000.0) + F.lit(0.5)).cast(
        "long"
    )
    scored = fx.select("doc_id", e3.alias("el2n_e3")).localCheckpoint(
        eager=False
    )
    kept = dsir_select_top_frac(
        scored.select(
            "doc_id", (F.col("el2n_e3") / F.lit(1000.0)).alias("dsir_weight")
        ),
        EL2N_KEEP_NUM / EL2N_KEEP_DEN,
    )
    return kept.join(scored, "doc_id").select("doc_id", "el2n_e3")


# GraNd selection size — MIRRORED in `_grand_sql`; change together.
# The logreg constants flow in via the shared `_logreg_ctes` chain.
GRAND_K = 100


def q_grand_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GraNd data pruning (Paul et al. 2021, same paper as EL2N) —
    rank examples by expected GRADIENT norm rather than error norm;
    under the logistic surrogate the per-example loss gradient is
    (p−y)·[1,x1,x2,x3], so GraNd = |p−y|·√(1+x1²+x2²+x3²) — EL2N
    times the feature norm, which is exactly why the paper treats
    them as siblings (EL2N drops the input-magnitude factor).  Both
    scores ship side-by-side so the rank disagreement — the
    feature-norm effect — is the output, not a hidden choice.

    Cross-engine: weights retrain via the shared deterministic GD
    (`_logreg_train` == `_logreg_ctes`); √ is correctly-rounded IEEE
    on identical rational doubles (bit-exact cross-engine), exp()
    appears once per row and the e3 floor absorbs its ulp (the el2n
    discipline); the |p−y| · sqrt(...) multiplication ORDER is
    mirrored in the SQL.  Selection is fixed-k (grand_e3 DESC,
    doc_id) — TakeOrderedAndProject, exact on both engines.

    Scale shape: training is the bounded agg loop; scoring is a pure
    map; selection is fixed-k top-k (k=GRAND_K — never a
    corpus-fraction driver merge)."""
    fx = logreg_features(_docs(spark, sf_dir))
    _, wv = _logreg_train(fx)
    m = (
        F.lit(wv[0]) * F.lit(1.0)
        + F.lit(wv[1]) * F.col("x1")
        + F.lit(wv[2]) * F.col("x2")
        + F.lit(wv[3]) * F.col("x3")
    )
    p = F.lit(1.0) / (F.lit(1.0) + F.exp(-m))
    nrm = F.sqrt(
        F.lit(1.0)
        + F.col("x1") * F.col("x1")
        + F.col("x2") * F.col("x2")
        + F.col("x3") * F.col("x3")
    )
    grand = F.floor(
        F.abs(p - F.col("y")) * nrm * F.lit(1000.0) + F.lit(0.5)
    ).cast("long")
    el2n = F.floor(F.abs(p - F.col("y")) * F.lit(1000.0) + F.lit(0.5)).cast(
        "long"
    )
    return (
        fx.select(
            "doc_id", grand.alias("grand_e3"), el2n.alias("el2n_e3")
        )
        .orderBy(F.desc("grand_e3"), "doc_id")
        .limit(GRAND_K)
    )


def _grand_sql(
    iters: int = LOGREG_ITERS,
    lr: float = LOGREG_LR,
    k: int | None = None,
) -> str:
    """GraNd oracle: the shared GD CTE chain to the final weights,
    the e3-floored |p−y|·sqrt(1+x1²+x2²+x3²) score (multiplication
    order mirrored), fixed-k (grand_e3 DESC, doc_id) selection."""
    k = GRAND_K if k is None else k
    parts = _logreg_ctes(iters, lr)
    m = "(w.w0 * 1.0 + w.w1 * x1 + w.w2 * x2 + w.w3 * x3)"
    p = f"(1.0 / (1.0 + exp(-{m})))"
    nrm = "sqrt(1.0 + x1 * x1 + x2 * x2 + x3 * x3)"
    return (
        "WITH "
        + ",\n".join(parts)
        + f""",
sc AS (
  SELECT doc_id,
         CAST(floor(abs({p} - y) * {nrm} * 1000 + 0.5) AS BIGINT)
           AS grand_e3,
         CAST(floor(abs({p} - y) * 1000 + 0.5) AS BIGINT) AS el2n_e3
  FROM fx, w{iters} w
), ranked AS (
  SELECT doc_id, grand_e3, el2n_e3,
         row_number() OVER (ORDER BY grand_e3 DESC, doc_id) AS rk
  FROM sc
)
SELECT doc_id, grand_e3, el2n_e3 FROM ranked WHERE rk <= {k}
"""
    )


# Gradient-alignment selection batch size — MIRRORED in the
# `gradient_align` oracle SQL; change together.  The val split is the
# holdout permille rule (VAL_FROM <= pm < TEST_FROM), so the holdout
# constants flow into this query too.
GRAD_K = 100


def q_gradient_align(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gradient-alignment data selection (LESS, Xia et al. 2024;
    TracIn, Pruthi et al. 2020) — pick the TRAIN documents whose
    loss gradient points the same way as the VALIDATION set's mean
    gradient, i.e. the examples one more training step on which most
    reduces val loss.  The targeted-selection complement of the
    distribution-matching selectors (DSIR matches input text, RHO
    scores by loss difference, this aligns parameter-space
    DIRECTIONS toward a held-out target).  With the logistic
    surrogate the per-doc gradient is (p−y)·[1,x1,x2,x3], so
    alignment = (p−y) · ⟨g_val, [1,x1,x2,x3]⟩ — a pure map.

    Cross-engine: weights retrain via the shared deterministic GD
    (`_logreg_train` == `_logreg_ctes`); the val-mean gradient uses
    the SAME 6-dp floor-stable form as the training gradients (so
    fold-order noise is absorbed exactly as in training), ships as 4
    literal doubles, and the per-doc alignment folds in the fixed
    g0+g1·x1+g2·x2+g3·x3 order; the score is the e3-floored BIGINT
    (the el2n exp-ulp discipline) and selection is (score DESC,
    doc_id) with FIXED k=GRAD_K — exact on both engines.

    Scale shape: training + the val gradient are bounded agg loops
    (val is a permille slice — metadata-scale output, corpus-scale
    scan shared with training); scoring is a pure map over TRAIN
    rows; selection is fixed-k TakeOrderedAndProject."""
    fx = logreg_features(_docs(spark, sf_dir)).withColumn(
        "pm", knuth_hash(F.col("doc_id")) % 1000
    )
    _, wv = _logreg_train(fx.drop("pm"))
    m = (
        F.lit(wv[0]) * F.lit(1.0)
        + F.lit(wv[1]) * F.col("x1")
        + F.lit(wv[2]) * F.col("x2")
        + F.lit(wv[3]) * F.col("x3")
    )
    p = F.lit(1.0) / (F.lit(1.0) + F.exp(-m))
    r = p - F.col("y")
    val = fx.where(
        (F.col("pm") >= HOLDOUT_VAL_FROM) & (F.col("pm") < HOLDOUT_TEST_FROM)
    )
    gv_row = val.agg(
        *[
            (
                F.floor(F.avg(r * xj) * F.lit(1000000.0) + F.lit(0.5))
                / F.lit(1000000.0)
            ).alias(f"g{j}")
            for j, xj in enumerate(
                [F.lit(1.0), F.col("x1"), F.col("x2"), F.col("x3")]
            )
        ]
    ).collect()[0]
    gv = [float(gv_row[f"g{j}"]) for j in range(4)]
    dot = (
        F.lit(gv[0]) * F.lit(1.0)
        + F.lit(gv[1]) * F.col("x1")
        + F.lit(gv[2]) * F.col("x2")
        + F.lit(gv[3]) * F.col("x3")
    )
    scored = fx.where(F.col("pm") < HOLDOUT_VAL_FROM).select(
        "doc_id",
        F.floor(r * dot * F.lit(1000.0) + F.lit(0.5))
        .cast("long")
        .alias("align_e3"),
        F.col("y").cast("long").alias("label"),
    )
    return scored.orderBy(F.desc("align_e3"), "doc_id").limit(GRAD_K)


def _gradient_align_sql(
    iters: int = LOGREG_ITERS, lr: float = LOGREG_LR, k: int = GRAD_K
) -> str:
    """gradient_align oracle: the shared GD CTE chain, the val-mean
    gradient in the identical 6-dp floor-stable form, the fixed-order
    alignment fold, e3-floored score, (score DESC, doc_id) top-k."""
    parts = _logreg_ctes(iters, lr)
    kh = f"(((doc_id % {KNUTH_P}) * {KNUTH_A}) % {KNUTH_P}) % 1000"
    m = "(w.w0 * 1.0 + w.w1 * x1 + w.w2 * x2 + w.w3 * x3)"
    p = f"(1.0 / (1.0 + exp(-{m})))"
    return (
        "WITH "
        + ",\n".join(parts)
        + f""",
gv AS (
  SELECT
    floor(sum(({p} - y) * 1.0) / count(*) * 1000000 + 0.5) / 1000000 AS g0,
    floor(sum(({p} - y) * x1) / count(*) * 1000000 + 0.5) / 1000000 AS g1,
    floor(sum(({p} - y) * x2) / count(*) * 1000000 + 0.5) / 1000000 AS g2,
    floor(sum(({p} - y) * x3) / count(*) * 1000000 + 0.5) / 1000000 AS g3
  FROM fx, w{iters} w
  WHERE {kh} >= {HOLDOUT_VAL_FROM} AND {kh} < {HOLDOUT_TEST_FROM}
), sc AS (
  SELECT doc_id,
    CAST(floor(({p} - y)
               * (g.g0 * 1.0 + g.g1 * x1 + g.g2 * x2 + g.g3 * x3)
               * 1000 + 0.5) AS BIGINT) AS align_e3,
    CAST(y AS BIGINT) AS label
  FROM fx, w{iters} w, gv g
  WHERE {kh} < {HOLDOUT_VAL_FROM}
)
SELECT doc_id, align_e3, label
FROM (SELECT *, row_number() OVER (
        ORDER BY align_e3 DESC, doc_id) AS rn FROM sc)
WHERE rn <= {k}
"""
    )


def q_tracin_influence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TracIn training-data influence (Pruthi et al., NeurIPS 2020)
    — `gradient_align` summed over the WHOLE training trajectory:
    influence(doc) = Σ_t g_doc(w_t)·ḡ_val(w_t) across the
    ``LOGREG_ITERS`` GD checkpoints (the constant per-step lr factors
    out).  A doc that aligns with the val gradient at EVERY
    checkpoint is genuinely val-helpful; one that aligns only at the
    final checkpoint (all `gradient_align` can see) may just be
    riding the endpoint — the trajectory sum is the published fix,
    and the influence twin of `cartography` (same checkpoints, read
    as example-level attribution instead of example-level dynamics).

    Cross-engine: checkpoint weights are the shared deterministic GD
    (`_logreg_train` == `_logreg_ctes`); each checkpoint's val-mean
    gradient uses the 6-dp floor-stable training-gradient form
    restricted to the val permille slice (the gradient_align rule —
    holdout constants flow in) and ships as 4 literals; per
    checkpoint the alignment term is e3-floored BIGINT
    floor((p_t−y)·⟨ḡ_t, x⟩·1e3 + 0.5), so influence_e3 = Σ_t term_t
    is an exact BIGINT sum.

    Scale shape: T bounded val-gradient aggs on top of the training
    loop already paid; scoring is ONE pure map over TRAIN rows (T
    margin folds against literals — no join, no window, zero extra
    exchanges); per-doc output, the dsir_weights annotation shape."""
    fx = logreg_features(_docs(spark, sf_dir)).withColumn(
        "pm", knuth_hash(F.col("doc_id")) % 1000
    )
    steps, _ = _logreg_train(fx.drop("pm"))
    wvs: dict[int, list[float]] = {}
    for it, j, w, _loss in steps:
        wvs.setdefault(it, [0.0] * 4)[j] = w
    xs = [F.lit(1.0), F.col("x1"), F.col("x2"), F.col("x3")]
    val = fx.where(
        (F.col("pm") >= HOLDOUT_VAL_FROM) & (F.col("pm") < HOLDOUT_TEST_FROM)
    )

    def checkpoint_term(wv: list[float]) -> F.Column:
        m = (
            F.lit(wv[0]) * xs[0]
            + F.lit(wv[1]) * xs[1]
            + F.lit(wv[2]) * xs[2]
            + F.lit(wv[3]) * xs[3]
        )
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-m))
        r = p - F.col("y")
        gv_row = val.agg(
            *[
                (
                    F.floor(F.avg(r * xj) * F.lit(1000000.0) + F.lit(0.5))
                    / F.lit(1000000.0)
                ).alias(f"g{j}")
                for j, xj in enumerate(xs)
            ]
        ).collect()[0]
        gv = [float(gv_row[f"g{j}"]) for j in range(4)]
        dot = (
            F.lit(gv[0]) * xs[0]
            + F.lit(gv[1]) * xs[1]
            + F.lit(gv[2]) * xs[2]
            + F.lit(gv[3]) * xs[3]
        )
        return (
            F.floor(r * dot * F.lit(1000.0) + F.lit(0.5)).cast("long")
        )

    terms = [checkpoint_term(wvs[it]) for it in range(1, LOGREG_ITERS + 1)]
    infl = terms[0]
    for t in terms[1:]:
        infl = infl + t
    return fx.where(F.col("pm") < HOLDOUT_VAL_FROM).select(
        "doc_id",
        infl.cast("long").alias("influence_e3"),
        F.col("y").cast("long").alias("label"),
    )


def _tracin_sql(iters: int = LOGREG_ITERS, lr: float = LOGREG_LR) -> str:
    """tracin_influence oracle: the shared GD CTE chain, one val-mean
    gradient CTE per checkpoint (the gradient_align 6-dp form against
    w{t}), then ONE per-doc select summing the e3-floored alignment
    terms across all checkpoints."""
    parts = _logreg_ctes(iters, lr)
    kh = f"(((doc_id % {KNUTH_P}) * {KNUTH_A}) % {KNUTH_P}) % 1000"
    gv_ctes = []
    terms = []
    for t in range(1, iters + 1):
        m = f"(a{t}.w0 * 1.0 + a{t}.w1 * x1 + a{t}.w2 * x2 + a{t}.w3 * x3)"
        p = f"(1.0 / (1.0 + exp(-{m})))"
        mv = f"(w.w0 * 1.0 + w.w1 * x1 + w.w2 * x2 + w.w3 * x3)"
        pv = f"(1.0 / (1.0 + exp(-{mv})))"
        gv_ctes.append(
            f"""gv{t} AS (
  SELECT
    floor(sum(({pv} - y) * 1.0) / count(*) * 1000000 + 0.5) / 1000000 AS g0,
    floor(sum(({pv} - y) * x1) / count(*) * 1000000 + 0.5) / 1000000 AS g1,
    floor(sum(({pv} - y) * x2) / count(*) * 1000000 + 0.5) / 1000000 AS g2,
    floor(sum(({pv} - y) * x3) / count(*) * 1000000 + 0.5) / 1000000 AS g3
  FROM fx, w{t} w
  WHERE {kh} >= {HOLDOUT_VAL_FROM} AND {kh} < {HOLDOUT_TEST_FROM}
)"""
        )
        dot = (
            f"(v{t}.g0 * 1.0 + v{t}.g1 * x1 + v{t}.g2 * x2 + v{t}.g3 * x3)"
        )
        terms.append(
            f"CAST(floor(({p} - y) * {dot} * 1000 + 0.5) AS BIGINT)"
        )
    froms = ", ".join(
        [f"w{t} a{t}" for t in range(1, iters + 1)]
        + [f"gv{t} v{t}" for t in range(1, iters + 1)]
    )
    return (
        "WITH "
        + ",\n".join(parts + gv_ctes)
        + f"""
SELECT doc_id,
       CAST({' + '.join(terms)} AS BIGINT) AS influence_e3,
       CAST(y AS BIGINT) AS label
FROM fx, {froms}
WHERE {kh} < {HOLDOUT_VAL_FROM}
"""
    )


# Split-conformal miscoverage α = CONF_ALPHA_NUM/CONF_ALPHA_DEN —
# MIRRORED in `_conformal_sql`; change together.  k = the integer
# ceil ((n_val+1)·(1−α)); k > n_val → qhat = 1000 (the infinite
# prediction set, covers everything).  Conformity score is the pure
# BIGINT |p_e3 − 1000·y| on the ALREADY-floored p_e3 (never re-floor
# |p−y| — exact halves could split the two forms).
CONF_ALPHA_NUM = 1
CONF_ALPHA_DEN = 10


def q_conformal_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-conformal calibration of the quality classifier (Vovk et
    al.; Angelopoulos & Bates 2021 tutorial): the val slice's
    conformity scores give the distribution-free threshold
    qhat = the ⌈(n+1)(1−α)⌉-th smallest score, and the audit reports
    the achieved coverage on BOTH holdout slices — val re-covers
    ≥ 1−α by construction (the finite-sample guarantee), test
    coverage is the honest generalization read.  Completes the
    classifier-audit family with the distribution-free guarantee
    (`calibration_bins` answers "are probabilities honest?",
    `brier_decomp` "why is the score what it is?", this "what
    threshold provably covers 90%?").

    Cross-engine: weights via the shared deterministic GD; conformity
    scores are pure BIGINT |p_e3 − 1000·y|; qhat is an exact rank on
    the BOUNDED ≤1001-key score histogram (the
    quality_gate_thresholds two-pass discipline — never a corpus-frac
    top-k, the ADVICE-banned driver merge); coverage counts and the
    permille ratio are BIGINTs.

    Scale shape: scoring is a pure map; the val histogram is ONE
    bounded hash agg whose collect is metadata-scale; coverage is a
    second pure-map pass + a 2-row agg."""
    import math

    fx = logreg_features(_docs(spark, sf_dir)).withColumn(
        "pm", knuth_hash(F.col("doc_id")) % 1000
    )
    _, wv = _logreg_train(fx.drop("pm"))
    m = (
        F.lit(wv[0]) * F.lit(1.0)
        + F.lit(wv[1]) * F.col("x1")
        + F.lit(wv[2]) * F.col("x2")
        + F.lit(wv[3]) * F.col("x3")
    )
    p = F.lit(1.0) / (F.lit(1.0) + F.exp(-m))
    p_e3 = F.floor(p * F.lit(1000.0) + F.lit(0.5)).cast("long")
    s = F.abs(p_e3 - F.lit(1000) * F.col("y").cast("long")).cast("long")
    scored = fx.where(F.col("pm") >= HOLDOUT_VAL_FROM).select(
        F.when(F.col("pm") >= HOLDOUT_TEST_FROM, F.lit("test"))
        .otherwise(F.lit("val"))
        .alias("split"),
        s.alias("s"),
    )
    hist = (
        scored.where(F.col("split") == "val")
        .groupBy("s")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .collect()
    )
    n_val = sum(r["cnt"] for r in hist)
    keep = CONF_ALPHA_DEN - CONF_ALPHA_NUM
    k = ((n_val + 1) * keep + CONF_ALPHA_DEN - 1) // CONF_ALPHA_DEN
    if k > n_val:
        qhat = 1000
    else:
        cum = 0
        qhat = 1000
        for r in sorted(hist, key=lambda r: r["s"]):
            cum += r["cnt"]
            if cum >= k:
                qhat = int(r["s"])
                break
    return scored.groupBy("split").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.when(F.col("s") <= qhat, 1).otherwise(0))
        .cast("long")
        .alias("n_covered"),
        F.expr(
            f"CAST((sum(CASE WHEN s <= {qhat} THEN 1 ELSE 0 END) * 1000)"
            " DIV count(*) AS BIGINT)"
        ).alias("covered_permille"),
        F.lit(qhat).cast("long").alias("qhat"),
    )


def _conformal_sql(
    iters: int = LOGREG_ITERS, lr: float = LOGREG_LR
) -> str:
    """conformal_coverage oracle: the shared GD CTE chain, the BIGINT
    conformity score, the bounded-histogram exact-rank qhat (cum-sum
    window over ≤1001 distinct keys) with the k > n_val → 1000 guard,
    and the per-split coverage rows."""
    parts = _logreg_ctes(iters, lr)
    kh = f"(((doc_id % {KNUTH_P}) * {KNUTH_A}) % {KNUTH_P}) % 1000"
    m = "(w.w0 * 1.0 + w.w1 * x1 + w.w2 * x2 + w.w3 * x3)"
    p = f"(1.0 / (1.0 + exp(-{m})))"
    keep = CONF_ALPHA_DEN - CONF_ALPHA_NUM
    return (
        "WITH "
        + ",\n".join(parts)
        + f""",
sc AS (
  SELECT CASE WHEN {kh} >= {HOLDOUT_TEST_FROM} THEN 'test'
         ELSE 'val' END AS split,
         abs(CAST(floor({p} * 1000 + 0.5) AS BIGINT)
             - 1000 * CAST(y AS BIGINT)) AS s
  FROM fx, w{iters} w
  WHERE {kh} >= {HOLDOUT_VAL_FROM}
), hist AS (
  SELECT s, CAST(count(*) AS BIGINT) AS cnt FROM sc
  WHERE split = 'val' GROUP BY 1
), nv AS (
  SELECT CAST(coalesce(sum(cnt), 0) AS BIGINT) AS n_val FROM hist
), kk AS (
  SELECT ((n_val + 1) * {keep} + {CONF_ALPHA_DEN - 1})
           // {CONF_ALPHA_DEN} AS k, n_val
  FROM nv
), qh AS (
  SELECT CASE WHEN kk.k > kk.n_val THEN 1000
         ELSE (SELECT min(s) FROM (
                 SELECT s, sum(cnt) OVER (ORDER BY s) AS cum FROM hist)
               WHERE cum >= kk.k) END AS qhat
  FROM kk
)
SELECT split, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CASE WHEN s <= qh.qhat THEN 1 ELSE 0 END) AS BIGINT)
         AS n_covered,
       CAST((sum(CASE WHEN s <= qh.qhat THEN 1 ELSE 0 END) * 1000)
            // count(*) AS BIGINT) AS covered_permille,
       CAST(qh.qhat AS BIGINT) AS qhat
FROM sc, qh GROUP BY split, qh.qhat
"""
    )


# Calibration histogram bin count — MIRRORED in `_calibration_sql`;
# change together.  Bins are least(p_e3 DIV 100, BINS-1) on the
# e3-floored BIGINT probability, so bin edges are exact cross-engine.
CALIB_BINS = 10


def q_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier calibration audit (Guo et al. 2017, "On Calibration
    of Modern Neural Networks") — the reliability-diagram /
    expected-calibration-error input for the trained quality
    classifier: bin every document by predicted probability and emit
    per bin the count, the positive-label count, and the exact
    integer sums needed to compute confidence, accuracy and ECE
    downstream.  Completes the classifier lifecycle: `logreg_quality`
    trains, `logreg_infer` serves, `el2n_prune` selects, this audits.

    Cross-engine: weights retrain via the shared deterministic GD
    (`_logreg_train` == the unrolled `_logreg_ctes` chain); p and
    |p - y| ship as e3-floored BIGINTs (the el2n discipline — exp()
    once per row, the floor absorbs engine exp() ulp drift); the bin
    is least(p_e3 DIV 100, CALIB_BINS-1) and every output column is a
    BIGINT count or sum — exact, no float aggregate anywhere.

    Scale shape: training is the bounded per-iteration agg loop;
    scoring is a pure map; the audit is ONE ≤CALIB_BINS-row hash agg."""
    fx = logreg_features(_docs(spark, sf_dir))
    _, wv = _logreg_train(fx)
    m = (
        F.lit(wv[0]) * F.lit(1.0)
        + F.lit(wv[1]) * F.col("x1")
        + F.lit(wv[2]) * F.col("x2")
        + F.lit(wv[3]) * F.col("x3")
    )
    p = F.lit(1.0) / (F.lit(1.0) + F.exp(-m))
    scored = fx.select(
        F.floor(p * F.lit(1000.0) + F.lit(0.5)).cast("long").alias("p_e3"),
        F.floor(F.abs(p - F.col("y")) * F.lit(1000.0) + F.lit(0.5))
        .cast("long")
        .alias("err_e3"),
        F.col("y").cast("long").alias("y_l"),
    )
    return (
        scored.select(
            F.least(F.expr("p_e3 DIV 100"), F.lit(CALIB_BINS - 1))
            .cast("long")
            .alias("bin"),
            "p_e3",
            "err_e3",
            "y_l",
        )
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("y_l").cast("long").alias("n_pos"),
            F.sum("p_e3").cast("long").alias("sum_p_e3"),
            F.sum("err_e3").cast("long").alias("sum_err_e3"),
        )
    )


def q_brier_decomp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brier-score decomposition (Murphy 1973): per calibration bin
    the RELIABILITY term n_b·(p̄_b − ō_b)² (how far the bin's mean
    forecast sits from its observed rate — penalizes miscalibration)
    and the RESOLUTION term n_b·(ō_b − ō)² (how far the bin's rate
    sits from the base rate — rewards discrimination), the two halves
    of Brier = reliability − resolution + uncertainty.  Upgrades
    `calibration_bins` from raw sums to the decomposition a forecast
    audit actually reads ("is my classifier bad because it's
    miscalibrated, or because it can't discriminate?").

    Cross-engine: everything derives from the e3-floored BIGINT p of
    the shared GD chain (`_logreg_train` == `_logreg_ctes` — logreg +
    CALIB_BINS constants flow in); bin rates are truncating-DIV e3
    ratios (p̄_b = sum_p_e3 DIV n, ō_b = 1000·n_pos DIV n, base rate
    ō likewise), so the squared terms are exact BIGINTs bounded by
    n_b·1e6 — no (sum·N)² overflow form anywhere.  Per-doc squared
    error ships as sum_err2_e6 = Σ err_e3² for the Brier total.

    Scale shape: the calibration_bins shape — pure-map scoring, ONE
    ≤CALIB_BINS-row hash agg, plus a 1-row global agg broadcast back
    by the standard scalar cross join."""
    fx = logreg_features(_docs(spark, sf_dir))
    _, wv = _logreg_train(fx)
    m = (
        F.lit(wv[0]) * F.lit(1.0)
        + F.lit(wv[1]) * F.col("x1")
        + F.lit(wv[2]) * F.col("x2")
        + F.lit(wv[3]) * F.col("x3")
    )
    p = F.lit(1.0) / (F.lit(1.0) + F.exp(-m))
    scored = fx.select(
        F.floor(p * F.lit(1000.0) + F.lit(0.5)).cast("long").alias("p_e3"),
        F.floor(F.abs(p - F.col("y")) * F.lit(1000.0) + F.lit(0.5))
        .cast("long")
        .alias("err_e3"),
        F.col("y").cast("long").alias("y_l"),
    )
    bins = (
        scored.select(
            F.least(F.expr("p_e3 DIV 100"), F.lit(CALIB_BINS - 1))
            .cast("long")
            .alias("bin"),
            "p_e3",
            "err_e3",
            "y_l",
        )
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("y_l").cast("long").alias("n_pos"),
            F.sum("p_e3").cast("long").alias("sum_p_e3"),
            F.sum(F.col("err_e3") * F.col("err_e3"))
            .cast("long")
            .alias("sum_err2_e6"),
        )
    )
    base = scored.agg(
        F.expr("CAST((1000 * sum(y_l)) DIV count(*) AS BIGINT)").alias(
            "obar_e3"
        )
    )
    return (
        bins.crossJoin(base)
        .select(
            "bin",
            "n",
            "n_pos",
            F.expr("CAST(sum_p_e3 DIV n AS BIGINT)").alias("pbar_e3"),
            F.expr("CAST((1000 * n_pos) DIV n AS BIGINT)").alias(
                "obar_bin_e3"
            ),
            "sum_err2_e6",
            "obar_e3",
        )
        .select(
            "bin",
            "n",
            "n_pos",
            "pbar_e3",
            "obar_bin_e3",
            "sum_err2_e6",
            F.expr(
                "CAST(n * (pbar_e3 - obar_bin_e3)"
                " * (pbar_e3 - obar_bin_e3) AS BIGINT)"
            ).alias("rel_term"),
            F.expr(
                "CAST(n * (obar_bin_e3 - obar_e3)"
                " * (obar_bin_e3 - obar_e3) AS BIGINT)"
            ).alias("res_term"),
        )
    )


def _brier_sql(
    iters: int = LOGREG_ITERS,
    lr: float = LOGREG_LR,
    bins: int = CALIB_BINS,
) -> str:
    """brier_decomp oracle: the calibration CTEs plus the truncating-
    DIV e3 bin/base rates and the n·(Δe3)² reliability/resolution
    terms — all BIGINT."""
    parts = _logreg_ctes(iters, lr)
    m = "(w.w0 * 1.0 + w.w1 * x1 + w.w2 * x2 + w.w3 * x3)"
    p = f"(1.0 / (1.0 + exp(-{m})))"
    return (
        "WITH "
        + ",\n".join(parts)
        + f""",
calib AS (
  SELECT CAST(floor({p} * 1000 + 0.5) AS BIGINT) AS p_e3,
         CAST(floor(abs({p} - y) * 1000 + 0.5) AS BIGINT) AS err_e3,
         CAST(y AS BIGINT) AS y_l
  FROM fx, w{iters} w
), b AS (
  SELECT CAST(least(p_e3 // 100, {bins - 1}) AS BIGINT) AS bin,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(y_l) AS BIGINT) AS n_pos,
         CAST(sum(p_e3) AS BIGINT) AS sum_p_e3,
         CAST(sum(err_e3 * err_e3) AS BIGINT) AS sum_err2_e6
  FROM calib GROUP BY 1
), g AS (
  SELECT CAST((1000 * sum(y_l)) // count(*) AS BIGINT) AS obar_e3
  FROM calib
), r AS (
  SELECT bin, n, n_pos,
         CAST(sum_p_e3 // n AS BIGINT) AS pbar_e3,
         CAST((1000 * n_pos) // n AS BIGINT) AS obar_bin_e3,
         sum_err2_e6, g.obar_e3
  FROM b, g
)
SELECT bin, n, n_pos, pbar_e3, obar_bin_e3, sum_err2_e6,
       CAST(n * (pbar_e3 - obar_bin_e3) * (pbar_e3 - obar_bin_e3)
            AS BIGINT) AS rel_term,
       CAST(n * (obar_bin_e3 - obar_e3) * (obar_bin_e3 - obar_e3)
            AS BIGINT) AS res_term
FROM r
"""
    )


# Uncertainty-sampling batch size — MIRRORED in the
# `uncertainty_sample` oracle SQL; change together.
UNC_K = 100


# Data-map region cuts — MIRRORED in `_cartography_sql`; change
# together.  Regions partition on the mean e3-floored true-label
# probability and the integer variance numerator
# var_num = T·Σx² − (Σx)² (x = ptrue_e3, T = LOGREG_ITERS), with the
# ambiguity threshold T²·CARTO_SD_E3² (σ ≥ 0.05 in probability —
# cuts sized to slice the synthetic corpus into all four regions).
# The CASE order IS the semantics (the filter_cascade rule).
CARTO_HI_E3 = 650
CARTO_LO_E3 = 500
CARTO_SD_E3 = 50


def q_cartography(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-dynamics data map (Dataset Cartography — Swayamdipta
    et al., EMNLP 2020): per document, the CONFIDENCE (mean true-label
    probability across the ``LOGREG_ITERS`` GD checkpoints) and
    VARIABILITY (variance across the same checkpoints) of the quality
    classifier — the map that splits a corpus into easy-to-learn
    (high-conf: safe bulk), hard-to-learn (low-conf: label noise /
    junk candidates) and ambiguous (high-variability: the most
    valuable training examples).  Completes the classifier lifecycle
    family with the TRAINING-DYNAMICS view (`el2n_prune` reads one
    final-checkpoint signal; this reads the whole trajectory).

    Cross-engine: checkpoint weights are the shared deterministic GD
    (`_logreg_train` == the unrolled `_logreg_ctes` chain — logreg
    constants flow in); per checkpoint x_t = the e3-floored BIGINT
    true-label probability (the uncertainty/el2n discipline, true
    label via y: p when y=1 else 1−p); conf_sum = Σx_t,
    mean_e3 = conf_sum DIV T, var_num = T·Σx² − (Σx)² — all-BIGINT
    past the floor, so regions cut exactly on both engines.

    Scale shape: training is the bounded per-iteration agg loop
    already paid by the logreg family; the map itself is ONE pure map
    over the corpus (T margin folds against literal weights — no
    join, no window, zero extra shuffles)."""
    fx = logreg_features(_docs(spark, sf_dir))
    steps, _ = _logreg_train(fx)
    wvs: dict[int, list[float]] = {}
    for it, j, w, _loss in steps:
        wvs.setdefault(it, [0.0, 0.0, 0.0, 0.0])[j] = w

    def pt_e3(wv: list[float]) -> F.Column:
        m = (
            F.lit(wv[0]) * F.lit(1.0)
            + F.lit(wv[1]) * F.col("x1")
            + F.lit(wv[2]) * F.col("x2")
            + F.lit(wv[3]) * F.col("x3")
        )
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-m))
        ptrue = F.when(F.col("y") == 1.0, p).otherwise(F.lit(1.0) - p)
        return F.floor(ptrue * F.lit(1000.0) + F.lit(0.5)).cast("long")

    t = LOGREG_ITERS
    xs = [pt_e3(wvs[it]) for it in range(1, t + 1)]
    s = xs[0]
    for x in xs[1:]:
        s = s + x
    sq = xs[0] * xs[0]
    for x in xs[1:]:
        sq = sq + x * x
    base = fx.select(
        "doc_id",
        F.col("y").cast("long").alias("label"),
        s.alias("conf_sum_e3"),
        sq.alias("sumsq"),
    ).select(
        "doc_id",
        "label",
        "conf_sum_e3",
        F.expr(f"conf_sum_e3 DIV {t}").cast("long").alias("mean_e3"),
        (F.lit(t) * F.col("sumsq") - F.col("conf_sum_e3") * F.col("conf_sum_e3"))
        .cast("long")
        .alias("var_num"),
    )
    thr = t * t * CARTO_SD_E3 * CARTO_SD_E3
    return base.select(
        "doc_id",
        "label",
        "conf_sum_e3",
        "mean_e3",
        "var_num",
        F.when(F.col("var_num") >= thr, F.lit("ambiguous"))
        .when(F.col("mean_e3") >= CARTO_HI_E3, F.lit("easy"))
        .when(F.col("mean_e3") < CARTO_LO_E3, F.lit("hard"))
        .otherwise(F.lit("mid"))
        .alias("region"),
    )


def _cartography_sql(
    iters: int = LOGREG_ITERS, lr: float = LOGREG_LR
) -> str:
    """cartography oracle: the shared GD CTE chain, then ONE per-doc
    select folding the T checkpoint margins (each against its w{t}
    CTE) into the e3-floored true-label probabilities and the
    all-BIGINT conf/var arithmetic with the mirrored region CASE."""
    parts = _logreg_ctes(iters, lr)
    pts = []
    for it in range(1, iters + 1):
        m = (
            f"(a{it}.w0 * 1.0 + a{it}.w1 * x1 + a{it}.w2 * x2"
            f" + a{it}.w3 * x3)"
        )
        p = f"(1.0 / (1.0 + exp(-{m})))"
        pts.append(
            f"CAST(floor((CASE WHEN y = 1.0 THEN {p} ELSE 1.0 - {p} END)"
            f" * 1000 + 0.5) AS BIGINT)"
        )
    s = " + ".join(f"x{i}" for i in range(len(pts)))
    sq = " + ".join(f"x{i} * x{i}" for i in range(len(pts)))
    xs_cols = ", ".join(f"{e} AS x{i}" for i, e in enumerate(pts))
    froms = ", ".join(f"w{it} a{it}" for it in range(1, iters + 1))
    t = iters
    thr = t * t * CARTO_SD_E3 * CARTO_SD_E3
    return (
        "WITH "
        + ",\n".join(parts)
        + f""",
xs AS (
  SELECT doc_id, CAST(y AS BIGINT) AS label, {xs_cols}
  FROM fx, {froms}
), sums AS (
  SELECT doc_id, label,
         CAST({s} AS BIGINT) AS conf_sum_e3,
         CAST({sq} AS BIGINT) AS sumsq
  FROM xs
)
SELECT doc_id, label, conf_sum_e3,
  CAST(conf_sum_e3 // {t} AS BIGINT) AS mean_e3,
  CAST({t} * sumsq - conf_sum_e3 * conf_sum_e3 AS BIGINT) AS var_num,
  CASE WHEN {t} * sumsq - conf_sum_e3 * conf_sum_e3 >= {thr}
         THEN 'ambiguous'
       WHEN conf_sum_e3 // {t} >= {CARTO_HI_E3} THEN 'easy'
       WHEN conf_sum_e3 // {t} < {CARTO_LO_E3} THEN 'hard'
       ELSE 'mid' END AS region
FROM sums
"""
    )


def q_uncertainty_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Active-learning uncertainty sampling (Lewis & Gale 1994;
    Settles 2009 survey) — the labeling-budget allocator for the
    quality classifier: pick the ``UNC_K`` documents whose predicted
    probability sits closest to the decision boundary, i.e. the docs
    whose human label would teach the model the most.  Closes the
    classifier lifecycle loop: `logreg_quality` trains,
    `logreg_infer` serves, `calibration_bins`/`roc_auc` audit, this
    decides what to label NEXT.

    Cross-engine: weights retrain via the shared deterministic GD
    (`_logreg_train` == the unrolled `_logreg_ctes` chain — logreg
    constants flow in); p ships as the e3-floored BIGINT (the
    el2n/calibration discipline), and the boundary distance
    dist_e3 = |2*p_e3 - 1000| is pure BIGINT arithmetic on it, so
    the (dist ASC, doc_id) selection order is exact on both engines.

    Scale shape: training is the bounded per-iteration agg loop;
    scoring is a pure map; selection is TakeOrderedAndProject with
    FIXED k=UNC_K (a labeling batch, not a corpus fraction — the
    driver merge is k rows per partition, safe at any corpus size,
    unlike the corpus-frac top-k ADVICE banned for DSIR)."""
    fx = logreg_features(_docs(spark, sf_dir))
    _, wv = _logreg_train(fx)
    m = (
        F.lit(wv[0]) * F.lit(1.0)
        + F.lit(wv[1]) * F.col("x1")
        + F.lit(wv[2]) * F.col("x2")
        + F.lit(wv[3]) * F.col("x3")
    )
    p = F.lit(1.0) / (F.lit(1.0) + F.exp(-m))
    p_e3 = F.floor(p * F.lit(1000.0) + F.lit(0.5)).cast("long")
    scored = fx.select(
        "doc_id",
        p_e3.alias("p_e3"),
        F.abs(F.lit(2) * p_e3 - F.lit(1000)).cast("long").alias("dist_e3"),
        F.col("y").cast("long").alias("label"),
    )
    return scored.orderBy("dist_e3", "doc_id").limit(UNC_K)


def _uncertainty_sql(
    iters: int = LOGREG_ITERS, lr: float = LOGREG_LR, k: int = UNC_K
) -> str:
    """uncertainty_sample oracle: the shared GD CTE chain to the final
    weights, the e3-floored probability, the BIGINT boundary distance,
    and the (dist ASC, doc_id) top-k as a window rank."""
    parts = _logreg_ctes(iters, lr)
    m = "(w.w0 * 1.0 + w.w1 * x1 + w.w2 * x2 + w.w3 * x3)"
    p = f"(1.0 / (1.0 + exp(-{m})))"
    return (
        "WITH "
        + ",\n".join(parts)
        + f""",
sc AS (
  SELECT doc_id,
         CAST(floor({p} * 1000 + 0.5) AS BIGINT) AS p_e3,
         CAST(y AS BIGINT) AS label
  FROM fx, w{iters} w
)
SELECT doc_id, p_e3, dist_e3, label
FROM (SELECT doc_id, p_e3, abs(2 * p_e3 - 1000) AS dist_e3, label,
             row_number() OVER (
               ORDER BY abs(2 * p_e3 - 1000), doc_id) AS rn
      FROM sc)
WHERE rn <= {k}
"""
    )


def q_roc_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROC curve + exact tie-aware AUC building blocks for the trained
    quality classifier — the threshold-selection audit that pairs with
    `calibration_bins` (calibration asks "are the probabilities
    honest?", this asks "how well does the score rank?", which is what
    a data-filtering threshold actually consumes).  One row per
    DISTINCT e3-floored predicted probability: the positive/negative
    count at that score, the cumulative true/false positives at the
    `p_e3 >= s` operating point, and the doubled trapezoid area slice
    area2 = n_neg·(2·cum_tp − n_pos); Σ area2 == 2·U (Mann-Whitney
    with midrank ties — the trapezoid over a tied block IS the
    midrank correction), so AUC = Σ area2 / (2·n_pos_total·
    n_neg_total) exactly, and TPR/FPR at every threshold fall out of
    the cum columns.

    Cross-engine: weights retrain via the shared deterministic GD
    (`_logreg_train` == the unrolled `_logreg_ctes` chain); p ships as
    the e3-floored BIGINT (the el2n/calibration discipline — exp()
    once per row, the floor absorbs engine exp() ulp drift); every
    output column is a BIGINT count or product — exact, no float
    aggregate anywhere.  The cumulative window runs over the ≤1001-row
    DISTINCT-score table (metadata scale — the histogram discipline,
    never a window over data rows); keys are distinct so the default
    RANGE frame agrees across engines.  area2's product is exact to
    ~10^9 positives × negatives per score row; past that the cum
    counts stay exact and the AUC consumer should use the e-scaled
    ratio form (the scorer_agreement bounded-product precedent).

    Scale shape: training is the bounded per-iteration agg loop;
    scoring is a pure map; the curve is ONE ≤1001-row hash agg plus a
    metadata-scale window."""
    from pyspark.sql.window import Window

    fx = logreg_features(_docs(spark, sf_dir))
    _, wv = _logreg_train(fx)
    m = (
        F.lit(wv[0]) * F.lit(1.0)
        + F.lit(wv[1]) * F.col("x1")
        + F.lit(wv[2]) * F.col("x2")
        + F.lit(wv[3]) * F.col("x3")
    )
    p = F.lit(1.0) / (F.lit(1.0) + F.exp(-m))
    scored = fx.select(
        F.floor(p * F.lit(1000.0) + F.lit(0.5)).cast("long").alias("p_e3"),
        F.col("y").cast("long").alias("y_l"),
    )
    b = scored.groupBy("p_e3").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y_l").cast("long").alias("n_pos"),
    )
    w = Window.orderBy(F.desc("p_e3"))
    return (
        b.select(
            "p_e3",
            "n_pos",
            (F.col("n") - F.col("n_pos")).cast("long").alias("n_neg"),
        )
        .select(
            "p_e3",
            "n_pos",
            "n_neg",
            F.sum("n_pos").over(w).cast("long").alias("cum_tp"),
            F.sum("n_neg").over(w).cast("long").alias("cum_fp"),
        )
        .select(
            "p_e3",
            "n_pos",
            "n_neg",
            "cum_tp",
            "cum_fp",
            (
                F.col("n_neg")
                * (F.lit(2) * F.col("cum_tp") - F.col("n_pos"))
            )
            .cast("long")
            .alias("area2"),
        )
    )


def q_pr_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Precision/recall/F1 sweep over the trained quality classifier —
    the filtering yield-vs-purity curve `roc_auc` doesn't give you:
    when a corpus is gated at `p_e3 >= s`, precision is the kept
    set's purity and recall is the fraction of good data retained,
    which is the tradeoff a data-filtering threshold is actually
    chosen on (ROC's FPR is nearly flat when positives are rare; PR
    is the standard view for imbalanced gates).  One row per DISTINCT
    e3-floored predicted probability with the operating point's
    precision_e6 / recall_e6 / f1_e6 and the average-precision term
    ap_term = n_pos·precision_e6, so AP = Σ ap_term DIV pos_total
    (the step-interpolated AP over the floored precisions —
    deterministic because both engines floor the same BIGINT ratios).

    Cross-engine: weights retrain via the shared deterministic GD
    (`_logreg_train` == `_logreg_ctes`); p ships as the e3-floored
    BIGINT (the roc_auc discipline); every ratio is a truncating DIV
    on BIGINT counts — cum_tp·1e6 stays exact to ~10^12 rows (the
    conformal/el2n bound).  pos_total comes from an OVER () window on
    the ≤1001-row curve table, not a corpus re-scan.

    Scale shape: training is the bounded per-iteration agg loop;
    scoring is a pure map; the curve is ONE ≤1001-row hash agg plus
    metadata-scale windows (the roc_auc shape exactly)."""
    from pyspark.sql.window import Window

    fx = logreg_features(_docs(spark, sf_dir))
    _, wv = _logreg_train(fx)
    m = (
        F.lit(wv[0]) * F.lit(1.0)
        + F.lit(wv[1]) * F.col("x1")
        + F.lit(wv[2]) * F.col("x2")
        + F.lit(wv[3]) * F.col("x3")
    )
    p = F.lit(1.0) / (F.lit(1.0) + F.exp(-m))
    scored = fx.select(
        F.floor(p * F.lit(1000.0) + F.lit(0.5)).cast("long").alias("p_e3"),
        F.col("y").cast("long").alias("y_l"),
    )
    b = scored.groupBy("p_e3").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y_l").cast("long").alias("n_pos"),
    )
    w = Window.orderBy(F.desc("p_e3"))
    wall = Window.partitionBy()
    c = (
        b.select(
            "p_e3",
            "n_pos",
            (F.col("n") - F.col("n_pos")).cast("long").alias("n_neg"),
        )
        .select(
            "p_e3",
            "n_pos",
            "n_neg",
            F.sum("n_pos").over(w).cast("long").alias("cum_tp"),
            F.sum("n_neg").over(w).cast("long").alias("cum_fp"),
            F.sum("n_pos").over(wall).cast("long").alias("pos_total"),
        )
    )
    return c.select(
        "p_e3",
        "n_pos",
        "n_neg",
        "cum_tp",
        "cum_fp",
        F.expr("(cum_tp * 1000000) DIV (cum_tp + cum_fp)").alias(
            "precision_e6"
        ),
        F.expr("(cum_tp * 1000000) DIV pos_total").alias("recall_e6"),
        F.expr(
            "(2 * cum_tp * 1000000) DIV (cum_tp + cum_fp + pos_total)"
        ).alias("f1_e6"),
        F.expr(
            "n_pos * ((cum_tp * 1000000) DIV (cum_tp + cum_fp))"
        ).alias("ap_term"),
    )


def _pr_curve_sql(iters: int = LOGREG_ITERS, lr: float = LOGREG_LR) -> str:
    """pr_curve oracle: the shared GD chain + the roc_auc distinct-
    score curve, then truncating-DIV precision/recall/F1 and the AP
    term — all BIGINT; pos_total via sum OVER () on the curve table."""
    parts = _logreg_ctes(iters, lr)
    m = "(w.w0 * 1.0 + w.w1 * x1 + w.w2 * x2 + w.w3 * x3)"
    p = f"(1.0 / (1.0 + exp(-{m})))"
    return (
        "WITH "
        + ",\n".join(parts)
        + f""",
sc AS (
  SELECT CAST(floor({p} * 1000 + 0.5) AS BIGINT) AS p_e3,
         CAST(y AS BIGINT) AS y_l
  FROM fx, w{iters} w
), b AS (
  SELECT p_e3, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(y_l) AS BIGINT) AS n_pos
  FROM sc GROUP BY 1
), c AS (
  SELECT p_e3, n_pos, CAST(n - n_pos AS BIGINT) AS n_neg,
         CAST(sum(n_pos) OVER (ORDER BY p_e3 DESC) AS BIGINT) AS cum_tp,
         CAST(sum(n - n_pos) OVER (ORDER BY p_e3 DESC) AS BIGINT) AS cum_fp,
         CAST(sum(n_pos) OVER () AS BIGINT) AS pos_total
  FROM b
)
SELECT p_e3, n_pos, n_neg, cum_tp, cum_fp,
       (cum_tp * 1000000) // (cum_tp + cum_fp) AS precision_e6,
       (cum_tp * 1000000) // pos_total AS recall_e6,
       (2 * cum_tp * 1000000) // (cum_tp + cum_fp + pos_total) AS f1_e6,
       n_pos * ((cum_tp * 1000000) // (cum_tp + cum_fp)) AS ap_term
FROM c
"""
    )


# Cohen's-kappa constants — MIRRORED in `_scorer_kappa_sql`; change
# together.  The gate predicts positive at p_e3 >= KAPPA_PRED_CUT;
# the per-source sample reuses scorer_agreement's AGREE_K knuth rule
# (same docs in both audits → the two agreement views are comparable),
# so AGREE_K changes move BOTH oracles.  700 sits inside the trained
# score distribution's interquartile range on the synthetic corpus
# (scores span ~666-747; a 500 cut predicts all-positive and kappa
# degenerates to 0) — the cartography rule: retune with the data
# model.
KAPPA_PRED_CUT = 700


def q_scorer_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source Cohen's kappa between the trained quality gate's
    prediction (p_e3 >= ``KAPPA_PRED_CUT``) and the gold label — the
    chance-corrected agreement audit that pairs with
    `scorer_agreement` (Spearman asks "do two scores RANK alike?",
    kappa asks "do a hard gate and the gold labels AGREE beyond
    chance?" — the number a labeling-QA pass reports per source,
    robust to per-source base rates that make raw accuracy
    misleading).  Emits the 2×2 confusion counts and
    kappa_e6 = (n·(n11+n00) − chance)·1e6 DIV (n² − chance) with
    chance = (n11+n10)(n11+n01) + (n01+n00)(n10+n00).

    Cross-engine: weights retrain via the shared deterministic GD;
    prediction thresholds the e3-floored BIGINT probability; kappa is
    a SIGNED truncating DIV on pure BIGINT counts (Spark DIV and
    DuckDB // both truncate toward zero — the zipf_alpha rule).  The
    per-source sample is bounded at AGREE_K docs (knuth order, doc_id
    tiebreak) so n² stays exact at any corpus size — the
    scorer_agreement bounded-product discipline; degenerate marginals
    (den = 0) emit kappa_e6 = 0 by convention.

    Scale shape: scoring is a pure map; ONE source-partitioned sample
    window (few-fat-partitions shape); the confusion agg is
    sources-scale."""
    from pyspark.sql.window import Window

    docs = _docs(spark, sf_dir)
    fx = logreg_features(docs)
    _, wv = _logreg_train(fx)
    m = (
        F.lit(wv[0]) * F.lit(1.0)
        + F.lit(wv[1]) * F.col("x1")
        + F.lit(wv[2]) * F.col("x2")
        + F.lit(wv[3]) * F.col("x3")
    )
    p = F.lit(1.0) / (F.lit(1.0) + F.exp(-m))
    scored = fx.select(
        "doc_id",
        F.floor(p * F.lit(1000.0) + F.lit(0.5)).cast("long").alias("p_e3"),
        F.col("y").cast("long").alias("y_l"),
    )
    uni = scored.join(docs.select("doc_id", "source"), "doc_id").select(
        "source",
        "doc_id",
        F.when(F.col("p_e3") >= KAPPA_PRED_CUT, F.lit(1))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("yhat"),
        "y_l",
        knuth_hash(F.col("doc_id")).alias("h"),
    )
    ws = Window.partitionBy("source").orderBy("h", "doc_id")
    keep = uni.withColumn("srk", F.row_number().over(ws)).where(
        F.col("srk") <= AGREE_K
    )
    agg = keep.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("yhat") * F.col("y_l")).cast("long").alias("n11"),
        F.sum(F.col("yhat") * (F.lit(1) - F.col("y_l")))
        .cast("long")
        .alias("n10"),
        F.sum((F.lit(1) - F.col("yhat")) * F.col("y_l"))
        .cast("long")
        .alias("n01"),
        F.sum((F.lit(1) - F.col("yhat")) * (F.lit(1) - F.col("y_l")))
        .cast("long")
        .alias("n00"),
    )
    chance = "((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00))"
    return agg.select(
        "source",
        "n",
        "n11",
        "n10",
        "n01",
        "n00",
        F.expr(
            f"CASE WHEN n * n - {chance} = 0 THEN CAST(0 AS BIGINT) "
            f"ELSE ((n * (n11 + n00) - {chance}) * 1000000) "
            f"DIV (n * n - {chance}) END"
        ).alias("kappa_e6"),
    )


def _scorer_kappa_sql(iters: int = LOGREG_ITERS, lr: float = LOGREG_LR) -> str:
    """scorer_kappa oracle: the shared GD chain, the e3-floored
    threshold prediction, the AGREE_K knuth sample per source, and
    the signed truncating-DIV kappa on BIGINT confusion counts."""
    parts = _logreg_ctes(iters, lr)
    m = "(w.w0 * 1.0 + w.w1 * x1 + w.w2 * x2 + w.w3 * x3)"
    p = f"(1.0 / (1.0 + exp(-{m})))"
    chance = "((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00))"
    return (
        "WITH "
        + ",\n".join(parts)
        + f""",
sc AS (
  SELECT doc_id,
         CAST(floor({p} * 1000 + 0.5) AS BIGINT) AS p_e3,
         CAST(y AS BIGINT) AS y_l
  FROM fx, w{iters} w
), uni AS (
  SELECT d.source, sc.doc_id,
         CASE WHEN p_e3 >= {KAPPA_PRED_CUT} THEN CAST(1 AS BIGINT)
              ELSE CAST(0 AS BIGINT) END AS yhat,
         y_l,
         ((sc.doc_id % {KNUTH_P}) * {KNUTH_A}) % {KNUTH_P} AS h
  FROM sc JOIN (SELECT doc_id, source FROM documents) d USING (doc_id)
), keep AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY source ORDER BY h, doc_id) AS srk
    FROM uni
  ) WHERE srk <= {AGREE_K}
), agg AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(yhat * y_l) AS BIGINT) AS n11,
         CAST(sum(yhat * (1 - y_l)) AS BIGINT) AS n10,
         CAST(sum((1 - yhat) * y_l) AS BIGINT) AS n01,
         CAST(sum((1 - yhat) * (1 - y_l)) AS BIGINT) AS n00
  FROM keep GROUP BY 1
)
SELECT source, n, n11, n10, n01, n00,
       CASE WHEN n * n - {chance} = 0 THEN CAST(0 AS BIGINT)
            ELSE CAST(((n * (n11 + n00) - {chance}) * 1000000)
                      // (n * n - {chance}) AS BIGINT) END AS kappa_e6
FROM agg
"""
    )


# Gradient-noise-scale constants — MIRRORED in `_grad_noise_sql`;
# change together.  GNS_PERMILLE gates the doc sample (knuth permille
# — a pure map, scale-invariant; lower it at larger corpora);
# components floor to e2 BIGINTs so the sum of squared gradients
# stays < 2^63 to ~2·10^10 sampled rows (e3 would cap at ~2·10^6).
GNS_PERMILLE = 200
GNS_SALT = 11


def q_grad_noise_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gradient-noise-scale / critical-batch-size estimate
    (McCandlish et al. 2018, "An Empirical Model of Large-Batch
    Training") over the quality classifier's per-example gradients —
    the statistic that tells a training run how large a batch still
    buys linear speedup: B_simple = tr(Σ)/|G|² where G is the mean
    per-example gradient and Σ its covariance.  Emits one row with
    the sampled count, the four e4-unit gradient component sums, the
    exact sum of squared components, and bsimple_e3 =
    floor(((n·Q − |S|²)/|S|²)·1000) — the algebraic identity
    tr(Σ)/|G|² = (n·Q − |S|²)/|S|² on the integer sums (biased
    covariance; the estimator's own convention).

    Cross-engine: weights retrain via the shared deterministic GD;
    the per-row gradient is (p_e2 − 100·y)·x_e2 per component — BOTH
    factors stable-floored e2 BIGINTs first (the floor absorbs
    engine exp() ulp, the el2n rule), so every sum is exact; the
    final ratio is the ONE explicitly-ordered double expression on
    the three exact BIGINTs (identical operands → identical IEEE
    result; the source_keyness double-cast rule because n·Q would
    overflow BIGINT at scale).

    Scale shape: scoring + gradient is a pure map behind a knuth
    permille gate; ONE 6-scalar hash agg; no window, no join."""
    fx = logreg_features(_docs(spark, sf_dir))
    _, wv = _logreg_train(fx)
    m = (
        F.lit(wv[0]) * F.lit(1.0)
        + F.lit(wv[1]) * F.col("x1")
        + F.lit(wv[2]) * F.col("x2")
        + F.lit(wv[3]) * F.col("x3")
    )
    p = F.lit(1.0) / (F.lit(1.0) + F.exp(-m))
    dp = (
        F.floor(p * F.lit(100.0) + F.lit(0.5)).cast("long")
        - F.lit(100) * F.col("y").cast("long")
    )

    def xe2(c: F.Column) -> F.Column:
        return F.floor(c * F.lit(100.0) + F.lit(0.5)).cast("long")

    g = fx.where(
        knuth_hash(F.col("doc_id") * GNS_SALT) % 1000 < GNS_PERMILLE
    ).select(
        (dp * F.lit(100)).alias("g0"),
        (dp * xe2(F.col("x1"))).alias("g1"),
        (dp * xe2(F.col("x2"))).alias("g2"),
        (dp * xe2(F.col("x3"))).alias("g3"),
    )
    agg = g.groupBy().agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("g0").cast("long").alias("s0"),
        F.sum("g1").cast("long").alias("s1"),
        F.sum("g2").cast("long").alias("s2"),
        F.sum("g3").cast("long").alias("s3"),
        F.sum(
            F.col("g0") * F.col("g0")
            + F.col("g1") * F.col("g1")
            + F.col("g2") * F.col("g2")
            + F.col("g3") * F.col("g3")
        )
        .cast("long")
        .alias("sum_sq"),
    )
    s2 = "(s0 * s0 + s1 * s1 + s2 * s2 + s3 * s3)"
    b = (
        f"((CAST(n AS DOUBLE) * CAST(sum_sq AS DOUBLE) "
        f"- CAST({s2} AS DOUBLE)) / CAST({s2} AS DOUBLE))"
    )
    return agg.select(
        "n",
        "s0",
        "s1",
        "s2",
        "s3",
        "sum_sq",
        F.expr(f"CAST(floor({b} * 1000) AS BIGINT)").alias("bsimple_e3"),
    )


def _grad_noise_sql(iters: int = LOGREG_ITERS, lr: float = LOGREG_LR) -> str:
    """grad_noise_scale oracle: the shared GD chain, e2-floored
    (p, x) factors, knuth permille gate, exact BIGINT sums, and the
    identical one-expression double ratio."""
    parts = _logreg_ctes(iters, lr)
    m = "(w.w0 * 1.0 + w.w1 * x1 + w.w2 * x2 + w.w3 * x3)"
    p = f"(1.0 / (1.0 + exp(-{m})))"
    dp = f"(CAST(floor({p} * 100 + 0.5) AS BIGINT) - 100 * CAST(y AS BIGINT))"
    gate = (
        f"((((doc_id * {GNS_SALT}) % {KNUTH_P}) * {KNUTH_A}) % {KNUTH_P})"
        f" % 1000 < {GNS_PERMILLE}"
    )
    s2 = "(s0 * s0 + s1 * s1 + s2 * s2 + s3 * s3)"
    b = (
        f"((CAST(n AS DOUBLE) * CAST(sum_sq AS DOUBLE) "
        f"- CAST({s2} AS DOUBLE)) / CAST({s2} AS DOUBLE))"
    )
    return (
        "WITH "
        + ",\n".join(parts)
        + f""",
g AS (
  SELECT {dp} * 100 AS g0,
         {dp} * CAST(floor(x1 * 100 + 0.5) AS BIGINT) AS g1,
         {dp} * CAST(floor(x2 * 100 + 0.5) AS BIGINT) AS g2,
         {dp} * CAST(floor(x3 * 100 + 0.5) AS BIGINT) AS g3
  FROM fx, w{iters} w
  WHERE {gate}
), agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(g0) AS BIGINT) AS s0,
         CAST(sum(g1) AS BIGINT) AS s1,
         CAST(sum(g2) AS BIGINT) AS s2,
         CAST(sum(g3) AS BIGINT) AS s3,
         CAST(sum(g0 * g0 + g1 * g1 + g2 * g2 + g3 * g3) AS BIGINT)
           AS sum_sq
  FROM g
)
SELECT n, s0, s1, s2, s3, sum_sq,
       CAST(floor({b} * 1000) AS BIGINT) AS bsimple_e3
FROM agg
"""
    )


def _logreg_ctes(iters: int = LOGREG_ITERS, lr: float = LOGREG_LR) -> list[str]:
    """The unrolled-GD CTE chain (fx, w0 .. w{iters}) shared by the
    `logreg_quality` and `logreg_infer` oracles — mirrors
    `_logreg_train` exactly: same features/label CTE as text_features,
    same fold order in the margin, 6-dp floor-stable mean gradients
    and loss, same w -= lr*g recurrence on the rounded values."""
    parts = [
        _scored_feats_ctes(),
        """fx AS (
  SELECT doc_id, alpha_ratio AS x1, least(n_chars / 500.0, 1.0) AS x2,
         punct_ratio AS x3,
         CASE WHEN lang_guess = 'en' THEN 1.0 ELSE 0.0 END AS y
  FROM feats
), w0 AS (SELECT 0.0 AS w0, 0.0 AS w1, 0.0 AS w2, 0.0 AS w3)""",
    ]
    for it in range(1, iters + 1):
        m = "(w.w0 * 1.0 + w.w1 * x1 + w.w2 * x2 + w.w3 * x3)"
        p = f"(1.0 / (1.0 + exp(-{m})))"
        parts.append(
            f"""g{it} AS (
  SELECT
    floor(sum(({p} - y) * 1.0) / count(*) * 1000000 + 0.5) / 1000000 AS g0,
    floor(sum(({p} - y) * x1) / count(*) * 1000000 + 0.5) / 1000000 AS g1,
    floor(sum(({p} - y) * x2) / count(*) * 1000000 + 0.5) / 1000000 AS g2,
    floor(sum(({p} - y) * x3) / count(*) * 1000000 + 0.5) / 1000000 AS g3,
    floor(sum(-(y * ln({p}) + (1.0 - y) * ln(1.0 - {p}))) / count(*)
          * 1000000 + 0.5) / 1000000 AS loss
  FROM fx, w{it - 1} w
), w{it} AS (
  SELECT w.w0 - {lr} * g.g0 AS w0, w.w1 - {lr} * g.g1 AS w1,
         w.w2 - {lr} * g.g2 AS w2, w.w3 - {lr} * g.g3 AS w3
  FROM w{it - 1} w, g{it} g
)"""
        )
    return parts


def _logreg_sql(iters: int = LOGREG_ITERS, lr: float = LOGREG_LR) -> str:
    """Per-step (it, j, w, loss) rows off the shared GD CTE chain."""
    parts = _logreg_ctes(iters, lr)
    sel = "\nUNION ALL\n".join(
        f"SELECT CAST({it} AS BIGINT) AS it, CAST({j} AS BIGINT) AS j, "
        f"w{it}.w{j} AS w, g{it}.loss AS loss FROM w{it}, g{it}"
        for it in range(1, iters + 1)
        for j in range(4)
    )
    return "WITH " + ",\n".join(parts) + "\n" + sel


def _logreg_infer_sql(iters: int = LOGREG_ITERS, lr: float = LOGREG_LR) -> str:
    """Inference oracle: same CTE chain to the final weights, then the
    identical-fold margin scored per doc, 5-dp floor-stable, decision
    by sign test."""
    parts = _logreg_ctes(iters, lr)
    m = "(w.w0 * 1.0 + w.w1 * x1 + w.w2 * x2 + w.w3 * x3)"
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
SELECT doc_id,
       floor({m} * 100000 + 0.5) / 100000 AS margin,
       CAST(CASE WHEN {m} >= 0 THEN 1 ELSE 0 END AS BIGINT) AS pred_en,
       CAST(y AS BIGINT) AS label
FROM fx, w{iters} w
"""
    )


def _el2n_sql(
    iters: int = LOGREG_ITERS,
    lr: float = LOGREG_LR,
    num: int = EL2N_KEEP_NUM,
    den: int = EL2N_KEEP_DEN,
) -> str:
    """EL2N oracle: the shared GD CTE chain to the final weights, the
    e3-floored BIGINT |p - y| score per doc, then the top-frac
    selection expressed as a window rank (pytest locks the Spark
    histogram selection bit-identical to this rank)."""
    parts = _logreg_ctes(iters, lr)
    m = "(w.w0 * 1.0 + w.w1 * x1 + w.w2 * x2 + w.w3 * x3)"
    p = f"(1.0 / (1.0 + exp(-{m})))"
    return (
        "WITH "
        + ",\n".join(parts)
        + f""",
el2n AS (
  SELECT doc_id,
         CAST(floor(abs({p} - y) * 1000 + 0.5) AS BIGINT) AS el2n_e3
  FROM fx, w{iters} w
), ranked AS (
  SELECT doc_id, el2n_e3,
         row_number() OVER (ORDER BY el2n_e3 DESC, doc_id) AS rk
  FROM el2n
), kn AS (
  SELECT greatest(1, (count(*) * {num}) // {den}) AS k FROM el2n
)
SELECT doc_id, el2n_e3 FROM ranked, kn WHERE rk <= k
"""
    )


def _calibration_sql(
    iters: int = LOGREG_ITERS,
    lr: float = LOGREG_LR,
    bins: int = CALIB_BINS,
) -> str:
    """Calibration oracle: the shared GD CTE chain to the final
    weights, e3-floored BIGINT p and |p - y| per doc, then the
    least(p_e3 // 100, BINS-1) bin and pure-BIGINT per-bin sums."""
    parts = _logreg_ctes(iters, lr)
    m = "(w.w0 * 1.0 + w.w1 * x1 + w.w2 * x2 + w.w3 * x3)"
    p = f"(1.0 / (1.0 + exp(-{m})))"
    return (
        "WITH "
        + ",\n".join(parts)
        + f""",
calib AS (
  SELECT CAST(floor({p} * 1000 + 0.5) AS BIGINT) AS p_e3,
         CAST(floor(abs({p} - y) * 1000 + 0.5) AS BIGINT) AS err_e3,
         CAST(y AS BIGINT) AS y_l
  FROM fx, w{iters} w
)
SELECT CAST(least(p_e3 // 100, {bins - 1}) AS BIGINT) AS bin,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(y_l) AS BIGINT) AS n_pos,
       CAST(sum(p_e3) AS BIGINT) AS sum_p_e3,
       CAST(sum(err_e3) AS BIGINT) AS sum_err_e3
FROM calib GROUP BY 1
"""
    )


def _roc_auc_sql(iters: int = LOGREG_ITERS, lr: float = LOGREG_LR) -> str:
    """ROC/AUC oracle: the shared GD CTE chain to the final weights,
    e3-floored BIGINT p per doc, then the distinct-score curve with
    cumulative TP/FP (ORDER BY p_e3 DESC — keys distinct, default
    RANGE frame agrees cross-engine) and the doubled trapezoid slice
    n_neg·(2·cum_tp − n_pos) — all BIGINT."""
    parts = _logreg_ctes(iters, lr)
    m = "(w.w0 * 1.0 + w.w1 * x1 + w.w2 * x2 + w.w3 * x3)"
    p = f"(1.0 / (1.0 + exp(-{m})))"
    return (
        "WITH "
        + ",\n".join(parts)
        + f""",
sc AS (
  SELECT CAST(floor({p} * 1000 + 0.5) AS BIGINT) AS p_e3,
         CAST(y AS BIGINT) AS y_l
  FROM fx, w{iters} w
), b AS (
  SELECT p_e3, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(y_l) AS BIGINT) AS n_pos
  FROM sc GROUP BY 1
), c AS (
  SELECT p_e3, n_pos, CAST(n - n_pos AS BIGINT) AS n_neg,
         CAST(sum(n_pos) OVER (ORDER BY p_e3 DESC) AS BIGINT) AS cum_tp,
         CAST(sum(n - n_pos) OVER (ORDER BY p_e3 DESC) AS BIGINT) AS cum_fp
  FROM b
)
SELECT p_e3, n_pos, n_neg, cum_tp, cum_fp,
       CAST(n_neg * (2 * cum_tp - n_pos) AS BIGINT) AS area2
FROM c
"""
    )


# AUC-bootstrap spec — MIRRORED in `_auc_bootstrap_sql`; change
# together.  AUCB_B replicates; per-(doc, b) weights are the shared
# `_poisson_weight_table()` literals indexed by the md5('ab{b}|'‖
# doc_id)-13-hex permille — md5, NOT knuth (the dawid_skene lesson:
# knuth is linear, so knuth(doc·M+b) correlates replicates); the
# doubled-U AUC form is the roc_auc slice on WEIGHTED counts,
# accumulated DECIMAL(38,0) ↔ HUGEINT.
AUCB_B = 20


def q_auc_bootstrap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson-bootstrap confidence interval for the classifier's AUC
    (Chamandy 2012 resampling × the Mann-Whitney identity) — the
    error bar `roc_auc`'s point estimate ships without: each of
    ``AUCB_B`` replicates reweights every doc w ~ Poisson(1) and
    recomputes AUC exactly on the reweighted sample, all in ONE pass
    — possible because AUC collapses onto the bounded e3-score
    histogram, so 'resampling the corpus' is just resampling
    integer cell weights.  Emits per replicate the weighted class
    masses and auc_e6, rank-ordered so the [2nd, 19th] rows are the
    ≈90% CI.

    Cross-engine: p_e3/y from the shared logreg chain (constants
    flow in); weights via the spliced Poisson inverse-CDF literals
    on md5 permilles; per (b, p_e3) weighted pos/neg sums are exact
    BIGINTs; cum_tp uses the DEFAULT RANGE frame per b (distinct
    keys — the roc_auc rule); the doubled-U slice wneg·(2·cum_tp −
    wpos) accumulates DECIMAL(38,0) ↔ HUGEINT (≈1e25 at corpus
    scale); auc_e6 = (auc2·1e6) DIV (2·P·N), all truncating DIVs on
    non-negatives.

    Scale shape: ONE ×B map-side explode feeding a hash agg onto
    (B × ≤1001) cells; everything after is metadata-scale."""
    from pyspark.sql.window import Window as _W

    fx = logreg_features(_docs(spark, sf_dir))
    _, wv = _logreg_train(fx)
    m = (
        F.lit(wv[0]) * F.lit(1.0)
        + F.lit(wv[1]) * F.col("x1")
        + F.lit(wv[2]) * F.col("x2")
        + F.lit(wv[3]) * F.col("x3")
    )
    p = F.lit(1.0) / (F.lit(1.0) + F.exp(-m))
    sc = fx.select(
        "doc_id",
        F.floor(p * F.lit(1000.0) + F.lit(0.5)).cast("long").alias("p_e3"),
        F.col("y").cast("long").alias("y_l"),
    )
    tab = F.array(*[F.lit(x) for x in _poisson_weight_table()])
    reps = sc.select(
        "p_e3",
        "y_l",
        "doc_id",
        F.explode(F.sequence(F.lit(1), F.lit(AUCB_B))).alias("b0"),
    ).select(
        "p_e3",
        "y_l",
        F.col("b0").cast("long").alias("b"),
        F.element_at(
            tab,
            (
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat(
                                F.lit("ab"),
                                F.col("b0").cast("string"),
                                F.lit("|"),
                                F.col("doc_id").cast("string"),
                            )
                        ),
                        1,
                        13,
                    ),
                    16,
                    10,
                ).cast("long")
                % 1000
            ).cast("int")
            + 1,
        )
        .cast("long")
        .alias("w"),
    )
    cells = reps.groupBy("b", "p_e3").agg(
        F.sum(F.when(F.col("y_l") == 1, F.col("w")).otherwise(0))
        .cast("long")
        .alias("wpos"),
        F.sum(F.when(F.col("y_l") == 0, F.col("w")).otherwise(0))
        .cast("long")
        .alias("wneg"),
    )
    cum = cells.withColumn(
        "cum_tp",
        F.sum("wpos")
        .over(_W.partitionBy("b").orderBy(F.col("p_e3").desc()))
        .cast("long"),
    )
    agg = cum.groupBy("b").agg(
        F.sum("wpos").cast("long").alias("w_pos"),
        F.sum("wneg").cast("long").alias("w_neg"),
        F.sum(
            # cast BEFORE multiplying (the degree_assortativity rule):
            # per-term wneg·(2·cum_tp−wpos) is ~1e22 at the design scale
            # — a BIGINT product would ANSI-overflow where the oracle's
            # CAST(wneg AS HUGEINT) * (...) succeeds
            F.col("wneg").cast("decimal(38,0)")
            * (2 * F.col("cum_tp") - F.col("wpos"))
        ).alias("auc2d"),
    )
    return agg.selectExpr(
        "b",
        "w_pos",
        "w_neg",
        "CAST(CASE WHEN w_pos > 0 AND w_neg > 0 THEN"
        " (auc2d * 1000000) DIV (2 * CAST(w_pos AS DECIMAL(38,0)) * w_neg)"
        " ELSE 0 END AS BIGINT) AS auc_e6",
    ).selectExpr(
        "b",
        "w_pos",
        "w_neg",
        "auc_e6",
        "CAST(row_number() OVER (ORDER BY auc_e6, b) AS BIGINT) AS rk",
    )


def _auc_bootstrap_sql(
    iters: int = LOGREG_ITERS, lr: float = LOGREG_LR, nb: int | None = None
) -> str:
    """auc_bootstrap oracle: the shared GD chain, the identical md5
    permille → Poisson-literal weights, weighted histogram, per-b
    default-frame cum, HUGEINT doubled-U, (auc ASC, b) ranks."""
    nb = AUCB_B if nb is None else nb
    parts = _logreg_ctes(iters, lr)
    tab = ", ".join(str(x) for x in _poisson_weight_table())
    mm = "(w.w0 * 1.0 + w.w1 * x1 + w.w2 * x2 + w.w3 * x3)"
    pp = f"(1.0 / (1.0 + exp(-{mm})))"
    return (
        "WITH "
        + ",\n".join(parts)
        + f""",
sc AS (
  SELECT doc_id,
         CAST(floor({pp} * 1000 + 0.5) AS BIGINT) AS p_e3,
         CAST(y AS BIGINT) AS y_l
  FROM fx, w{iters} w
), ptab AS (SELECT [{tab}] AS t),
reps AS (
  SELECT s.p_e3, s.y_l, CAST(r.b AS BIGINT) AS b,
         CAST(ptab.t[CAST(('0x' || substr(md5('ab' || CAST(r.b AS VARCHAR)
                || '|' || CAST(s.doc_id AS VARCHAR)), 1, 13)) AS BIGINT)
                % 1000 + 1] AS BIGINT) AS w
  FROM sc s CROSS JOIN range(1, {nb + 1}) r(b) CROSS JOIN ptab
), cells AS (
  SELECT b, p_e3,
         CAST(sum(CASE WHEN y_l = 1 THEN w ELSE 0 END) AS BIGINT) AS wpos,
         CAST(sum(CASE WHEN y_l = 0 THEN w ELSE 0 END) AS BIGINT) AS wneg
  FROM reps GROUP BY 1, 2
), cum AS (
  SELECT b, p_e3, wpos, wneg,
         CAST(sum(wpos) OVER (PARTITION BY b ORDER BY p_e3 DESC)
              AS BIGINT) AS cum_tp
  FROM cells
), agg AS (
  SELECT b, CAST(sum(wpos) AS BIGINT) AS w_pos,
         CAST(sum(wneg) AS BIGINT) AS w_neg,
         sum(CAST(wneg AS HUGEINT) * (2 * cum_tp - wpos)) AS auc2d
  FROM cum GROUP BY 1
)
SELECT b, w_pos, w_neg,
       CAST(CASE WHEN w_pos > 0 AND w_neg > 0 THEN
         (auc2d * 1000000) // (2 * CAST(w_pos AS HUGEINT) * w_neg)
         ELSE 0 END AS BIGINT) AS auc_e6,
       CAST(row_number() OVER (ORDER BY
         CAST(CASE WHEN w_pos > 0 AND w_neg > 0 THEN
           (auc2d * 1000000) // (2 * CAST(w_pos AS HUGEINT) * w_neg)
           ELSE 0 END AS BIGINT), b) AS BIGINT) AS rk
FROM agg
"""
    )


# --- BPE tokenizer training ----------------------------------------------------

# BPE training constants — baked into the unrolled `_bpe_merges_sql`
# oracle; change together.  The doubled-space merge-application trick
# (see q_bpe_merges) is load-bearing on BOTH engines.
BPE_ITERS = 8
BPE_MAX_WORDS = 10000
BPE_EOW = "</w>"


def bpe_apply_merge(syms, left: str, right: str):
    """Apply one BPE merge (left, right) -> left+right to a space-
    separated symbol string via the DOUBLED-SPACE trick: doubling the
    separators gives every pair occurrence its own boundary spaces, so
    one left-to-right non-overlapping replace pass merges greedily
    exactly like canonical BPE ('a a a' -> 'aa a') — and Spark, DuckDB
    and Python str.replace all share that scan semantics (continue
    after the replacement), so all three implementations agree
    byte-for-byte (tests/test_text.py adversarial cases)."""
    padded = F.concat(
        F.lit(" "), F.replace(syms, F.lit(" "), F.lit("  ")), F.lit(" ")
    )
    replaced = F.replace(
        padded, F.lit(f" {left}  {right} "), F.lit(f" {left}{right} ")
    )
    return F.trim(F.replace(replaced, F.lit("  "), F.lit(" ")))


def q_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer training (Sennrich et al. 2016, learned merge
    ops) as a first-class distributed operator — the merge table IS
    the tokenizer model, and the merge LOOP is value-hash-checked by
    an unrolled SQL mirror (the kmeans discipline).

    Words are lowercase-ascii segments ``[a-z]+`` of the RAW text (no
    lower(): engine lower() implementations disagree on exotic
    unicode); the corpus collapses to a (word, count) table capped at
    ``BPE_MAX_WORDS`` by (count desc, word) — the classical trick that
    makes BPE training cost corpus-size-independent after one pass.
    Each word starts as space-joined chars + ' </w>'.  Per merge step:
    adjacent-pair counts weighted by word count (vocab-scale agg),
    best pair by (total desc, pair asc) — ascii-binary order on both
    engines — then the merge applies via the DOUBLED-SPACE replace

        trim(collapse2(replace(' '+double(s)+' ', ' l  r ', ' lr ')))

    where double() turns every separator into two spaces, so each
    pair occurrence owns its boundary spaces and ONE left-to-right
    non-overlapping replace pass (identical scan semantics in Spark
    and DuckDB `replace`) merges occurrences greedily exactly like
    canonical BPE ('a a a' -> 'aa a').  Emits (it, pair, merged,
    total) for ``BPE_ITERS`` merges.

    Scale shape: ONE corpus-scale pass (word-explode hash agg, capped
    TakeOrdered); the loop then runs entirely on the cached bounded
    word table — per step one vocab-scale agg + top-1 TakeOrdered,
    merge application is a pure string map; no UDF anywhere."""
    rows = bpe_train(_docs(spark, sf_dir))
    return spark.createDataFrame(
        rows, "it long, pair string, merged string, total long"
    )


def bpe_train(docs: DataFrame) -> list[tuple[int, str, str, int]]:
    """The BPE training loop behind q_bpe_merges (and the encoder in
    q_bpe_encode): returns [(it, pair, merged, total)] for
    ``BPE_ITERS`` merges.  Driver state is one merge tuple per
    iteration — metadata-scale."""
    words = (
        docs.select(
            F.explode(
                F.expr("regexp_extract_all(text, '[a-z]+', 0)")
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .orderBy(F.col("cnt").desc(), "word")
        .limit(BPE_MAX_WORDS)
    )
    w0 = words.select(
        F.expr(
            "array_join(transform(sequence(1, length(word)),"
            " i -> substring(word, i, 1)), ' ')"
            f" || ' {BPE_EOW}'"
        ).alias("syms"),
        "cnt",
    ).cache()
    syms = F.col("syms")
    rows = []
    for it in range(1, BPE_ITERS + 1):
        arr = F.split(syms, " ")
        pairs = F.when(
            F.size(arr) >= 2,
            F.transform(
                F.sequence(F.lit(0), F.size(arr) - 2),
                lambda i: F.concat(
                    F.get(arr, i), F.lit(" "), F.get(arr, i + 1)
                ),
            ),
        ).otherwise(F.expr("cast(array() as array<string>)"))
        best = (
            w0.select(F.explode(pairs).alias("pair"), "cnt")
            .groupBy("pair")
            .agg(F.sum("cnt").cast("long").alias("total"))
            .orderBy(F.col("total").desc(), "pair")
            .limit(1)
            .collect()[0]
        )
        left, right = best["pair"].split(" ")
        rows.append((it, best["pair"], left + right, int(best["total"])))
        syms = bpe_apply_merge(syms, left, right)
    w0.unpersist()
    return rows


def bpe_encode_word_expr(w, merges):
    """Column expression encoding ONE ``[a-z]+`` word column with the
    learned merge list: char-split + ' </w>' seeding, then the
    ``BPE_ITERS`` merges applied in training order via
    `bpe_apply_merge` — pure Catalyst string work (the merge table
    rides along as string literals).  Shared by `q_bpe_encode` and
    `q_tokenizer_fertility` so both encode identically."""
    s = F.concat(
        F.array_join(
            F.transform(
                F.sequence(F.lit(1), F.length(w)),
                lambda i: w.substr(i, F.lit(1)),
            ),
            " ",
        ),
        F.lit(" " + BPE_EOW),
    )
    for _it, pair, _merged, _total in merges:
        left, right = pair.split(" ")
        s = bpe_apply_merge(s, left, right)
    return s


def q_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer APPLY — the other half of the BPE story: encode every
    document with the merge table `bpe_train` just learned and emit
    per-doc token accounting (n_words, n_bpe_tokens, ascii-chars per
    token — the compression-ratio quality signal real pipelines
    threshold on — plus an md5 of the full encoded symbol stream so
    the oracle locks every token boundary, not just the counts).

    Encoding is a PURE MAP: each doc's ``[a-z]+`` words become
    char-split symbol strings and the ``BPE_ITERS`` learned merges
    apply in training order via `bpe_apply_merge` inside one
    transform() lambda — no UDF, no join, no shuffle (the merge table
    rides along as 8 string literals).  Scale shape: train once
    (bounded, see bpe_train), then encoding 10^12 docs is
    embarrassingly parallel Catalyst string work.

    Cross-engine: the oracle replays the SAME unrolled training CTEs
    (b1..b8) and applies them with the identical doubled-space
    replace chain inside a list_transform lambda — md5 over the
    space-joined stream matches byte-for-byte."""
    docs = _docs(spark, sf_dir)
    merges = bpe_train(docs)
    ws = F.expr("regexp_extract_all(text, '[a-z]+', 0)")
    syms = F.transform(ws, lambda w: bpe_encode_word_expr(w, merges))
    joined = F.array_join(syms, " ")
    n_words = F.size(ws)
    n_toks = F.size(F.split(joined, " "))
    az_chars = F.length(F.array_join(ws, ""))
    return docs.select(
        "doc_id",
        n_words.cast("long").alias("n_words"),
        F.when(n_words > 0, n_toks)
        .otherwise(F.lit(0))
        .cast("long")
        .alias("n_bpe_tokens"),
        F.when(
            n_words > 0,
            round5_stable(az_chars.cast("double") / n_toks.cast("double")),
        ).alias("chars_per_token"),
        F.when(n_words > 0, F.md5(joined)).alias("enc_md5"),
    )


def _bpe_encode_sql(iters: int = BPE_ITERS) -> str:
    """Oracle for q_bpe_encode: the unrolled training CTEs feed a
    1-row merge table (p1..m{iters} columns) cross-joined onto docs;
    the lambda applies the same doubled-space replace chain."""
    # reuse the training CTE chain verbatim (words, w0, p/b/w 1..iters)
    train = _bpe_merges_sql(iters)
    ctes = train[len("WITH ") : train.rindex("\nSELECT CAST(1")]
    mcols = ", ".join(
        f"(SELECT pair FROM b{it}) AS p{it}, "
        f"(SELECT merged FROM b{it}) AS m{it}"
        for it in range(1, iters + 1)
    )
    expr = (
        "array_to_string(list_transform(generate_series(1, length(w)),"
        " i -> w[i:i]), ' ') || ' " + BPE_EOW + "'"
    )
    for it in range(1, iters + 1):
        expr = (
            "trim(replace(replace("
            f"' ' || replace({expr}, ' ', '  ') || ' ', "
            f"' ' || replace(p{it}, ' ', '  ') || ' ', "
            f"' ' || m{it} || ' '), '  ', ' '))"
        )
    return f"""WITH {ctes},
m AS MATERIALIZED (SELECT {mcols}),
enc AS (
  SELECT doc_id, regexp_extract_all(text, '[a-z]+') AS ws,
         list_transform(regexp_extract_all(text, '[a-z]+'),
                        w -> {expr}) AS syms
  FROM documents, m
)
SELECT doc_id,
  CAST(len(ws) AS BIGINT) AS n_words,
  CAST(CASE WHEN len(ws) > 0
       THEN len(string_split(array_to_string(syms, ' '), ' '))
       ELSE 0 END AS BIGINT) AS n_bpe_tokens,
  CASE WHEN len(ws) > 0 THEN
    floor(length(array_to_string(ws, ''))
          / CAST(len(string_split(array_to_string(syms, ' '), ' '))
                 AS DOUBLE) * 100000 + 0.5) / 100000
  END AS chars_per_token,
  CASE WHEN len(ws) > 0 THEN md5(array_to_string(syms, ' ')) END AS enc_md5
FROM enc
"""


def q_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language tokenizer fertility audit — the standard
    multilingual tokenizer-equity metric (Rust et al. 2021, "How Good
    is Your Tokenizer?"): pooled tokens-per-word (fertility) and
    ascii-chars-per-token (compression) of the learned BPE, grouped
    by document language.  This is how real pipelines detect that a
    tokenizer trained on skewed data over-fragments some languages —
    the per-lang twin of `bpe_encode` (which audits per doc).

    Cross-engine exact: encoding reuses `bpe_encode_word_expr` (the
    proven doubled-space merge chain); every per-doc count is BIGINT;
    the pooled ratios ship as (sum*1e5) DIV sum integer division —
    exact on both engines, no float aggregate anywhere.  Languages
    with zero ``[a-z]+`` words are dropped on both sides (the ratio
    is undefined there).

    Scale shape: train once (bounded, `bpe_train`), then ONE pure-map
    encoding pass over the corpus and ONE <=|langs|-row hash agg —
    the same embarrassingly-parallel shape as `bpe_encode`."""
    docs = _docs(spark, sf_dir)
    merges = bpe_train(docs)
    ws = F.expr("regexp_extract_all(text, '[a-z]+', 0)")
    syms = F.transform(ws, lambda w: bpe_encode_word_expr(w, merges))
    joined = F.array_join(syms, " ")
    n_words = F.size(ws)
    n_toks = (
        F.when(n_words > 0, F.size(F.split(joined, " ")))
        .otherwise(F.lit(0))
        .cast("long")
    )
    per = docs.select(
        "lang",
        n_words.cast("long").alias("n_words"),
        n_toks.alias("n_toks"),
        F.length(F.array_join(ws, "")).cast("long").alias("az_chars"),
    )
    agg = per.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_words").cast("long").alias("n_words"),
        F.sum("n_toks").cast("long").alias("n_bpe_tokens"),
        F.sum("az_chars").cast("long").alias("az_chars"),
    )
    return agg.where(F.col("n_words") > 0).select(
        "lang",
        "n_docs",
        "n_words",
        "n_bpe_tokens",
        "az_chars",
        F.expr("CAST((n_bpe_tokens * 100000) DIV n_words AS BIGINT)").alias(
            "fertility_e5"
        ),
        F.expr(
            "CAST((az_chars * 100000) DIV n_bpe_tokens AS BIGINT)"
        ).alias("chars_per_token_e5"),
    )


def _tokenizer_fertility_sql(iters: int = BPE_ITERS) -> str:
    """Fertility oracle: the unrolled BPE training CTEs feed the same
    1-row merge table and doubled-space replace chain as
    `_bpe_encode_sql`, then per-lang BIGINT sums and the (sum*1e5)
    DIV sum pooled ratios — exact past the shared BPE spec."""
    train = _bpe_merges_sql(iters)
    ctes = train[len("WITH ") : train.rindex("\nSELECT CAST(1")]
    mcols = ", ".join(
        f"(SELECT pair FROM b{it}) AS p{it}, "
        f"(SELECT merged FROM b{it}) AS m{it}"
        for it in range(1, iters + 1)
    )
    expr = (
        "array_to_string(list_transform(generate_series(1, length(w)),"
        " i -> w[i:i]), ' ') || ' " + BPE_EOW + "'"
    )
    for it in range(1, iters + 1):
        expr = (
            "trim(replace(replace("
            f"' ' || replace({expr}, ' ', '  ') || ' ', "
            f"' ' || replace(p{it}, ' ', '  ') || ' ', "
            f"' ' || m{it} || ' '), '  ', ' '))"
        )
    return f"""WITH {ctes},
m AS MATERIALIZED (SELECT {mcols}),
enc AS (
  SELECT lang, regexp_extract_all(text, '[a-z]+') AS ws,
         list_transform(regexp_extract_all(text, '[a-z]+'),
                        w -> {expr}) AS syms
  FROM documents, m
), per AS (
  SELECT lang,
    CAST(len(ws) AS BIGINT) AS n_words,
    CAST(CASE WHEN len(ws) > 0
         THEN len(string_split(array_to_string(syms, ' '), ' '))
         ELSE 0 END AS BIGINT) AS n_toks,
    CAST(length(array_to_string(ws, '')) AS BIGINT) AS az_chars
  FROM enc
)
SELECT lang,
  CAST(count(*) AS BIGINT) AS n_docs,
  CAST(sum(n_words) AS BIGINT) AS n_words,
  CAST(sum(n_toks) AS BIGINT) AS n_bpe_tokens,
  CAST(sum(az_chars) AS BIGINT) AS az_chars,
  CAST((sum(n_toks) * 100000) // sum(n_words) AS BIGINT) AS fertility_e5,
  CAST((sum(az_chars) * 100000) // sum(n_toks) AS BIGINT)
    AS chars_per_token_e5
FROM per GROUP BY lang HAVING sum(n_words) > 0
"""


def _bpe_merges_sql(iters: int = BPE_ITERS) -> str:
    """Unrolled BPE merge loop in DuckDB mirroring q_bpe_merges
    exactly: same capped word table, same ' </w>' char seeding, same
    (total desc, pair) winner, same doubled-space replace."""
    parts = [
        f"""words AS (
  SELECT word, CAST(count(*) AS BIGINT) AS cnt FROM (
    SELECT unnest(regexp_extract_all(text, '[a-z]+')) AS word
    FROM documents
  ) GROUP BY word ORDER BY cnt DESC, word LIMIT {BPE_MAX_WORDS}
), w0 AS MATERIALIZED (
  SELECT array_to_string(list_transform(generate_series(1, length(word)),
           i -> word[i:i]), ' ') || ' {BPE_EOW}' AS syms, cnt
  FROM words
)"""
    ]
    for it in range(1, iters + 1):
        parts.append(
            f"""p{it} AS (
  SELECT pair, CAST(sum(cnt) AS BIGINT) AS total FROM (
    SELECT cnt, unnest(list_transform(generate_series(1, len(s) - 1),
             i -> s[i] || ' ' || s[i + 1])) AS pair
    FROM (SELECT string_split(syms, ' ') AS s, cnt FROM w{it - 1})
  ) GROUP BY pair
), b{it} AS MATERIALIZED (
  SELECT pair, replace(pair, ' ', '') AS merged, total
  FROM p{it} ORDER BY total DESC, pair LIMIT 1
), w{it} AS MATERIALIZED (
  SELECT trim(replace(replace(
           ' ' || replace(syms, ' ', '  ') || ' ',
           (SELECT ' ' || replace(pair, ' ', '  ') || ' ' FROM b{it}),
           (SELECT ' ' || merged || ' ' FROM b{it})),
         '  ', ' ')) AS syms, cnt
  FROM w{it - 1}
)"""
        )
    sel = "\nUNION ALL\n".join(
        f"SELECT CAST({it} AS BIGINT) AS it, pair, merged, total FROM b{it}"
        for it in range(1, iters + 1)
    )
    return "WITH " + ",\n".join(parts) + "\n" + sel


# --- keyword extraction / n-gram LM / filter funnel / curriculum -----------------

# TF-IDF constants — MIRRORED in the `tfidf_topterms` oracle SQL;
# change together.  The IDF is the RECIPROCAL form idf = N/df (no
# ln): division of identical int64-derived doubles is IEEE-exact on
# both engines, so ranking ties are deterministic without any
# rounding step — the same cross-engine-exactness reasoning that
# picked sqrt over pow for `mixture_sample`.  (Log-IDF only compresses
# the range; it never reorders terms within a doc when tf is equal,
# and the ordering this emits is the classic tf·idf one.)
TFIDF_TOPK = 3


def q_tfidf_topterms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document keyword extraction: top-``TFIDF_TOPK`` terms by
    TF-IDF (reciprocal-IDF variant, constants above) with stopwords
    removed — the per-doc feature-extraction sibling of `bm25_topk`
    (which ranks DOCS for a query; this ranks TERMS for a doc), used
    for topic labeling, clustering features, and index pruning in a
    curation pipeline.  The reference has no analog; training-data
    extension.

    Scale shape: explode → (doc, term) hash agg [exchange 1] →
    term-keyed DF agg [exchange 2, vocab-scale output] → term equi-join
    (stopword removal bounds the hot keys; AQE skew-join handles the
    rest) → per-doc top-k via rank-filter, which Spark 4 plans as
    WindowGroupLimit — partial top-k BEFORE the window shuffle, so no
    doc's full term list crosses the wire.  N_docs is a single driver
    scalar (metadata-scale, the lm_score vocab pattern)."""
    from pyspark.sql.window import Window

    from rxtls_spark.functions.text import STOPWORDS

    docs = (
        _docs(spark, sf_dir)
        .select("doc_id", "text")
        .where(F.trim("text") != "")
    )
    n_docs = docs.count()  # metadata-scale scalar
    tf = (
        docs.select("doc_id", F.explode(_lm_tokens()).alias("term"))
        .where(~F.col("term").isin(*STOPWORDS))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    # score = tf * (N/df): two IEEE ops on identical doubles — the SQL
    # oracle parenthesizes identically; never tf*N/df (re-association
    # changes the double AND tf*N can overflow int64 under ANSI).
    score = F.col("tf").cast("double") * (
        F.lit(float(n_docs)) / F.col("df").cast("double")
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("score"), F.col("term")
    )
    return (
        tf.join(dfreq, "term")
        .select("doc_id", "term", "tf", "df", score.alias("score"))
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= TFIDF_TOPK)
        .select(
            "doc_id",
            "term",
            F.col("tf").cast("long").alias("tf"),
            F.col("df").cast("long").alias("df"),
            "score",
            F.col("rk").cast("long").alias("rk"),
        )
    )


# Bigram-LM constants — MIRRORED in the `bigram_lm_score` oracle SQL;
# change together.  Small vocab (30) so the synthetic corpus exercises
# the OOV path, exactly like `lm_score`.
BIGRAM_VOCAB_K = 30


def _bigrams() -> F.Column:
    """JVM-side bigram array over `_lm_tokens()`: element i is
    ``tok[i] || ' ' || tok[i+1]`` (0-based), empty for single-token
    docs — mirrored by the oracle's list_transform(generate_series)."""
    toks = _lm_tokens()
    left = F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0)))
    return F.transform(left, lambda t, i: F.concat(t, F.lit(" "), F.get(toks, i + 1)))


def _bigram_vocab(docs: DataFrame, vocab_k: int) -> dict[str, float]:
    """Two metadata-scale passes → top-K bigram conditional log-probs
    ln(c(w1 w2)/c(w1)) as a driver-side dict.  c2 ≤ c1 always (every
    bigram occurrence IS a left-unigram occurrence), so p ≤ 1."""
    import math

    live = docs.where(F.trim("text") != "")
    c2 = (
        live.select(F.explode(_bigrams()).alias("bg"))
        .groupBy("bg")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), "bg")
        .limit(vocab_k)
        .collect()
    )
    left_words = sorted({r["bg"].split(" ")[0] for r in c2})
    c1 = {
        r["tok"]: r["cnt"]
        for r in (
            live.select(F.explode(_lm_tokens()).alias("tok"))
            .where(F.col("tok").isin(left_words))
            .groupBy("tok")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .collect()
        )
    }
    return {
        r["bg"]: math.log(r["cnt"] / c1[r["bg"].split(" ")[0]]) for r in c2
    }


def q_bigram_lm_score(
    spark: SparkSession, sf_dir: str, vocab_k: int = BIGRAM_VOCAB_K
) -> DataFrame:
    """Bigram-LM fluency scoring — the KenLM-style CONDITIONAL upgrade
    of `lm_score`: average log-probability ln p(w2|w1) of a doc's
    bigrams under the corpus's own top-K bigram distribution, plus
    bigram and OOV counts.  Unigram scoring reads token plausibility;
    conditional bigram scoring reads local word ORDER — the signal
    n-gram quality filters actually gate on.

    Scale shape: the vocab is two bounded hash aggs (top-K bigrams,
    then the ≤K left-word unigram counts) shipped back as a LITERAL
    map; scoring is a pure per-row fold over the JVM-built bigram
    array — zero exchanges, no token explode (plan-locked).  Single-
    token docs emit n_bigrams=0 with a NULL average, mirrored by the
    oracle's LEFT JOIN.  Cross-engine care: p = c2/c1 is the identical
    rational double on both sides; Python math.log vs DuckDB ln() are
    only ulp-close, and the sums fold in different orders, so the
    per-doc average is rounded 3-dp STABLE (the lm_score discipline)."""
    docs = _docs(spark, sf_dir).select("doc_id", "text")
    vocab = _bigram_vocab(docs, vocab_k)
    lp_map = F.create_map(*[F.lit(x) for kv in vocab.items() for x in kv])
    bi = _bigrams()
    lp = F.transform(bi, lambda b: lp_map[b])
    in_vocab = F.filter(lp, lambda x: x.isNotNull())
    n_in = F.size(in_vocab)
    avg_lp = F.aggregate(in_vocab, F.lit(0.0), lambda a, x: a + x) / n_in.cast(
        "double"
    )
    return docs.where(F.trim("text") != "").select(
        "doc_id",
        F.size(bi).cast("long").alias("n_bigrams"),
        (F.size(bi) - n_in).cast("long").alias("n_oov"),
        F.when(n_in > 0, round3_stable(avg_lp)).alias("avg_logprob"),
    )


# Readability formula constants (Coleman-Liau 1975: CLI = 0.0588·L −
# 0.296·S − 15.8, L = letters per 100 words, S = sentences per 100
# words) — the DIV-chain form below is MIRRORED in the `readability`
# oracle SQL; change together.  Coleman-Liau is the readability index
# that needs NO syllable counting, so it is exactly computable
# cross-engine.  Sentence rule: ASCII terminator run [.!?]+ followed
# by whitespace-or-end; letters = ASCII [A-Za-z] (both pure-ASCII
# classes where Java regex == RE2).
CLI_L_NUM = 588  # 0.0588 · 1e4
CLI_S_NUM = 2960  # 0.296 · 1e4
CLI_BIAS_E4 = 158000  # 15.8 · 1e4


def q_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document readability profile — the grade-level signal a
    curation mixture reads next to `text_features`' quality score
    (CCNet buckets by LM perplexity; classic curricula also bucket by
    READABILITY — children's text trains differently than legalese):
    exact sentence/word/letter counts and the Coleman-Liau index, the
    one standard readability formula with no syllable estimation, so
    both engines compute it EXACTLY.

    Cross-engine: sentences = count of [.!?]+ terminator runs
    followed by whitespace-or-end (ASCII classes, Java == RE2);
    letters = ASCII [A-Za-z] count via regexp_replace-and-length;
    words = the `_lm_tokens` whitespace rule.  L100/S100 ship as
    e3-scaled truncating-DIV BIGINTs and cli_e4 as the mirrored
    DIV-chain (CLI_L_NUM·L100_e3) DIV 1000 − (CLI_S_NUM·S100_e3) DIV
    1000 − CLI_BIAS_E4 — all BIGINT, signed DIV truncates toward zero
    on both engines.

    Scale shape: a pure per-row Catalyst map — zero exchanges, no
    explode (letters via one regexp_replace, sentences via one
    regexp_count, words via split+size)."""
    docs = (
        _docs(spark, sf_dir)
        .select("doc_id", "text")
        .where(F.trim("text") != "")
    )
    n_words = F.size(_lm_tokens()).cast("long")
    n_letters = F.length(
        F.regexp_replace(F.col("text"), "[^A-Za-z]", "")
    ).cast("long")
    n_sents = F.regexp_count(
        F.col("text"), F.lit("[.!?]+([ \\t\\n\\x0B\\f\\r]+|$)")
    ).cast("long")
    base = docs.select(
        "doc_id",
        n_words.alias("n_words"),
        n_letters.alias("n_letters"),
        F.greatest(n_sents, F.lit(1).cast("long")).alias("n_sents"),
    )
    return base.select(
        "doc_id",
        "n_words",
        "n_letters",
        "n_sents",
        F.expr("(n_letters * 100000) DIV n_words").alias("l100_e3"),
        F.expr("(n_sents * 100000) DIV n_words").alias("s100_e3"),
        F.expr(
            f"({CLI_L_NUM} * ((n_letters * 100000) DIV n_words)) DIV 1000"
            f" - ({CLI_S_NUM} * ((n_sents * 100000) DIV n_words)) DIV 1000"
            f" - {CLI_BIAS_E4}"
        )
        .cast("long")
        .alias("cli_e4"),
    )


def _readability_sql() -> str:
    """readability oracle: identical ASCII regex counts and the same
    DIV-chain CLI — DuckDB regexp needs the 'g' flag for global
    replace and len(regexp_extract_all) for the terminator count."""
    return f"""
WITH base AS (
  SELECT doc_id,
    CAST(len(regexp_split_to_array(trim(lower(text)),
             '[ \\t\\n\\x0B\\f\\r]+')) AS BIGINT) AS n_words,
    CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
         AS BIGINT) AS n_letters,
    greatest(CAST(len(regexp_extract_all(text,
             '[.!?]+([ \\t\\n\\x0B\\f\\r]+|$)')) AS BIGINT), 1)
      AS n_sents
  FROM documents WHERE trim(text) <> ''
)
SELECT doc_id, n_words, n_letters, n_sents,
  CAST((n_letters * 100000) // n_words AS BIGINT) AS l100_e3,
  CAST((n_sents * 100000) // n_words AS BIGINT) AS s100_e3,
  CAST(({CLI_L_NUM} * ((n_letters * 100000) // n_words)) // 1000
       - ({CLI_S_NUM} * ((n_sents * 100000) // n_words)) // 1000
       - {CLI_BIAS_E4} AS BIGINT) AS cli_e4
FROM base
"""


# Source-keyness constants — MIRRORED in `_source_keyness_sql`;
# change together.  Candidate tokens are the top-KEY_VOCAB_K corpus
# unigrams ((cnt DESC, tok) rule); PMI is computed as the ONE
# expression text ln((c_st·N)/(c_s·c_t)) with every operand cast to
# DOUBLE BEFORE multiplying (identical IEEE mul/mul/div/ln on both
# engines — and no BIGINT product overflow at any corpus size), then
# e3-floored; top-KEY_TOPK per source by (pmi_e3 DESC, tok).
KEY_VOCAB_K = 200
KEY_TOPK = 10


def q_source_keyness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Characteristic-vocabulary extraction per source — pointwise
    mutual information between source and token (the corpus-linguistics
    "keyness" table; Church & Hanks 1990 association ratio): which
    tokens appear in THIS source far above their corpus rate.  The
    per-source twin of `tfidf_topterms` (per-doc) and the readable
    companion of `source_kl` (which yields one divergence number —
    this names the tokens responsible).  A mixture reviewer reads the
    top-PMI table to see WHAT a source actually contains before
    assigning it budget.

    Cross-engine: candidate vocab = top-K corpus unigrams (exact
    BIGINT counts, (cnt DESC, tok) tie rule); PMI_e3 is the e3-floored
    ln of the double-cast ratio (identical expression text both
    engines); per-source top-k by (pmi_e3 DESC, tok) as a window rank.

    Scale shape: ONE token-explode hash agg into (source, token)
    counts (the zipf/source_kl shuffle), the candidate vocab broadcast
    back as a semi-join filter; the keyness table is then
    |sources|·K rows — metadata-scale for the window."""
    from pyspark.sql.window import Window

    docs = (
        _docs(spark, sf_dir)
        .select("source", "text")
        .where(F.trim("text") != "")
    )
    toks = docs.select("source", F.explode(_lm_tokens()).alias("tok"))
    c_t = toks.groupBy("tok").agg(
        F.count(F.lit(1)).cast("long").alias("c_t")
    )
    vocab = c_t.orderBy(F.col("c_t").desc(), "tok").limit(KEY_VOCAB_K)
    c_st = (
        toks.join(F.broadcast(vocab.select("tok")), "tok")
        .groupBy("source", "tok")
        .agg(F.count(F.lit(1)).cast("long").alias("c_st"))
    )
    c_s = toks.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("c_s")
    )
    n_row = toks.agg(F.count(F.lit(1)).cast("long").alias("n"))
    j = (
        c_st.join(F.broadcast(vocab), "tok")
        .join(F.broadcast(c_s), "source")
        .crossJoin(F.broadcast(n_row))
    )
    pmi = F.expr(
        "CAST(floor(ln((CAST(c_st AS DOUBLE) * CAST(n AS DOUBLE))"
        " / (CAST(c_s AS DOUBLE) * CAST(c_t AS DOUBLE))) * 1000)"
        " AS BIGINT)"
    )
    w = Window.partitionBy("source").orderBy(
        F.desc("pmi_e3"), F.col("tok")
    )
    return (
        j.select("source", "tok", "c_st", "c_t", pmi.alias("pmi_e3"))
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= KEY_TOPK)
    )


def _source_keyness_sql(
    vocab_k: int = KEY_VOCAB_K, topk: int = KEY_TOPK
) -> str:
    """source_keyness oracle: identical token chain, top-K candidate
    vocab, the one-expression double-cast PMI, and the per-source
    window top-k."""
    return f"""
WITH toks AS (
  SELECT source, unnest(regexp_split_to_array(trim(lower(text)),
                        '[ \\t\\n\\x0B\\f\\r]+')) AS tok
  FROM documents WHERE trim(text) <> ''
), c_t AS (
  SELECT tok, CAST(count(*) AS BIGINT) AS c_t FROM toks
  GROUP BY 1 ORDER BY c_t DESC, tok LIMIT {vocab_k}
), c_st AS (
  SELECT source, t.tok, CAST(count(*) AS BIGINT) AS c_st
  FROM toks t JOIN c_t USING (tok) GROUP BY 1, 2
), c_s AS (
  SELECT source, CAST(count(*) AS BIGINT) AS c_s FROM toks GROUP BY 1
), nn AS (
  SELECT CAST(count(*) AS BIGINT) AS n FROM toks
), scored AS (
  SELECT st.source, st.tok, st.c_st, t.c_t,
         CAST(floor(ln((CAST(st.c_st AS DOUBLE) * CAST(nn.n AS DOUBLE))
                       / (CAST(s.c_s AS DOUBLE) * CAST(t.c_t AS DOUBLE)))
                    * 1000) AS BIGINT) AS pmi_e3
  FROM c_st st
  JOIN c_t t USING (tok)
  JOIN c_s s USING (source)
  CROSS JOIN nn
)
SELECT source, tok, c_st, c_t, pmi_e3, CAST(rank AS BIGINT) AS rank
FROM (SELECT *, row_number() OVER (
        PARTITION BY source ORDER BY pmi_e3 DESC, tok) AS rank
      FROM scored)
WHERE rank <= {topk}
"""


# Stupid Backoff constants — MIRRORED in `_stupid_backoff_sql`; change
# together.  α = SB_ALPHA_NUM/SB_ALPHA_DEN (Brants et al.'s 0.4), the
# backoff unigram vocab is the top-SB_UNI_K tokens, and every per-term
# score is the e3-LM floor floor(ln(·)·1000) — Python math.log and
# engine ln() are ulp-close on the identical rational, absorbed by the
# floor (the ccnet/doremi discipline).
SB_ALPHA_NUM = 2
SB_ALPHA_DEN = 5
SB_UNI_K = 50


def _sb_vocabs(
    docs: DataFrame, vocab_k: int, uni_k: int
) -> tuple[dict[str, int], dict[str, int]]:
    """Driver-side Stupid-Backoff tables: top-K bigram direct scores
    floor(ln(c2/c1)·1e3) and top-uni_k unigram backoff scores
    floor(ln(α·cu/N)·1e3) — all INT e3 values, so the literal maps
    ship exact BIGINTs and the per-doc fold is pure integer."""
    import math

    live = docs.where(F.trim("text") != "")
    c2 = (
        live.select(F.explode(_bigrams()).alias("bg"))
        .groupBy("bg")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), "bg")
        .limit(vocab_k)
        .collect()
    )
    left_words = sorted({r["bg"].split(" ")[0] for r in c2})
    c1 = {
        r["tok"]: r["cnt"]
        for r in (
            live.select(F.explode(_lm_tokens()).alias("tok"))
            .where(F.col("tok").isin(left_words))
            .groupBy("tok")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .collect()
        )
    }
    bg_map = {
        r["bg"]: math.floor(
            math.log(r["cnt"] / c1[r["bg"].split(" ")[0]]) * 1000
        )
        for r in c2
    }
    uni = live.select(F.explode(_lm_tokens()).alias("tok")).groupBy(
        "tok"
    ).agg(F.count(F.lit(1)).alias("cnt"))
    n_total = uni.agg(F.sum("cnt").alias("n")).collect()[0]["n"]
    utop = uni.orderBy(F.col("cnt").desc(), "tok").limit(uni_k).collect()
    uni_map = {
        r["tok"]: math.floor(
            math.log(
                (SB_ALPHA_NUM * r["cnt"]) / (SB_ALPHA_DEN * n_total)
            )
            * 1000
        )
        for r in utop
    }
    return bg_map, uni_map


def q_stupid_backoff(
    spark: SparkSession, sf_dir: str, vocab_k: int = BIGRAM_VOCAB_K
) -> DataFrame:
    """Stupid Backoff scoring (Brants et al., EMNLP 2007 — "Large
    Language Models in Machine Translation"): the web-scale n-gram
    smoothing that made trillion-token LMs practical by replacing
    normalized discounting with a fixed-penalty backoff — score
    S(w2|w1) = c(w1 w2)/c(w1) when the bigram is known, else
    α·c(w2)/N.  Completes the n-gram estimator family
    (`bigram_lm_score` = MLE, `kn_bigram_score` = Kneser-Ney,
    `good_turing` = the evidence table, this = the
    score-don't-normalize variant that actually ships at 100 TB).

    Cross-engine: both vocab tables ship as INT-e3 literal maps (the
    e3-LM floor per TERM, so the per-doc sum is an exact BIGINT —
    stronger than bigram_lm_score's rounded float mean); direct beats
    backoff via coalesce on both engines; mean_e3 = sum DIV n_scored
    is a SIGNED truncating DIV (Spark DIV == DuckDB //).

    Scale shape: three bounded hash aggs (top-K bigrams, left-word
    counts, top-uni_k unigrams + total) ship literal maps; scoring is
    a pure per-row fold over the JVM bigram array — zero exchanges,
    no token explode."""
    docs = _docs(spark, sf_dir).select("doc_id", "text")
    bg_map, uni_map = _sb_vocabs(docs, vocab_k, SB_UNI_K)
    bmap = F.create_map(
        *[F.lit(x) for kv in bg_map.items() for x in kv]
    )
    umap = F.create_map(
        *[F.lit(x) for kv in uni_map.items() for x in kv]
    )
    bi = _bigrams()
    direct = F.transform(bi, lambda b: bmap[b].cast("long"))
    backoff = F.transform(
        bi, lambda b: umap[F.element_at(F.split(b, " "), 2)].cast("long")
    )
    term = F.zip_with(direct, backoff, lambda a, b: F.coalesce(a, b))
    scored = F.filter(term, lambda x: x.isNotNull())
    n_direct = F.size(F.filter(direct, lambda x: x.isNotNull()))
    n_scored = F.size(scored)
    ssum = F.aggregate(
        scored, F.lit(0).cast("long"), lambda a, x: a + x
    )
    return (
        docs.where(F.trim("text") != "")
        .select(
            "doc_id",
            F.size(bi).cast("long").alias("n_bigrams"),
            n_direct.cast("long").alias("n_direct"),
            (n_scored - n_direct).cast("long").alias("n_backoff"),
            (F.size(bi) - n_scored).cast("long").alias("n_oov"),
            ssum.alias("score_sum_e3"),
        )
        .withColumn(
            "mean_e3",
            F.when(
                F.col("n_direct") + F.col("n_backoff") > 0,
                F.expr("score_sum_e3 DIV (n_direct + n_backoff)"),
            ).cast("long"),
        )
    )


def _stupid_backoff_sql(
    vocab_k: int = BIGRAM_VOCAB_K, uni_k: int = SB_UNI_K
) -> str:
    """stupid_backoff oracle: the bigram_lm_score vocab CTEs plus the
    top-uni_k backoff table over the full unigram counts, INT-e3
    per-term scores, coalesce(direct, backoff), BIGINT sums and the
    signed truncating-DIV mean."""
    return f"""
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '[ \\t\\n\\x0B\\f\\r]+') AS t
  FROM documents WHERE trim(text) <> ''
), pairs AS (
  SELECT doc_id, list_transform(generate_series(1, len(t) - 1),
                                i -> t[i] || ' ' || t[i+1]) AS g2
  FROM toks
), bg AS (
  SELECT doc_id, unnest(g2) AS bg FROM pairs
), c2 AS (
  SELECT bg, CAST(count(*) AS BIGINT) AS cnt FROM bg
  GROUP BY 1 ORDER BY cnt DESC, bg LIMIT {vocab_k}
), c1 AS (
  SELECT tok, CAST(count(*) AS BIGINT) AS cnt
  FROM (SELECT unnest(t) AS tok FROM toks) GROUP BY 1
), v AS (
  SELECT c2.bg,
         CAST(floor(ln(c2.cnt / CAST(c1.cnt AS DOUBLE)) * 1000)
              AS BIGINT) AS lp_e3
  FROM c2 JOIN c1 ON split_part(c2.bg, ' ', 1) = c1.tok
), c1x AS (
  SELECT tok, CAST(count(*) AS BIGINT) AS cnt
  FROM (SELECT unnest(t) AS tok FROM toks) GROUP BY 1
), nn AS (
  SELECT CAST(sum(cnt) AS BIGINT) AS n FROM c1x
), u AS (
  SELECT tok,
         CAST(floor(ln(CAST({SB_ALPHA_NUM} * cnt AS DOUBLE)
                       / CAST({SB_ALPHA_DEN} * (SELECT n FROM nn)
                              AS DOUBLE)) * 1000) AS BIGINT) AS lp_e3
  FROM c1x ORDER BY cnt DESC, tok LIMIT {uni_k}
), terms AS (
  SELECT bg.doc_id, v.lp_e3 AS d_e3, u.lp_e3 AS b_e3,
         coalesce(v.lp_e3, u.lp_e3) AS term_e3
  FROM bg
  LEFT JOIN v USING (bg)
  LEFT JOIN u ON split_part(bg.bg, ' ', 2) = u.tok
), s AS (
  SELECT doc_id, count(*) AS n_bg, count(d_e3) AS n_direct,
         count(term_e3) AS n_scored,
         coalesce(sum(term_e3), 0) AS ssum
  FROM terms GROUP BY 1
)
SELECT t.doc_id,
  CAST(coalesce(s.n_bg, 0) AS BIGINT) AS n_bigrams,
  CAST(coalesce(s.n_direct, 0) AS BIGINT) AS n_direct,
  CAST(coalesce(s.n_scored, 0) - coalesce(s.n_direct, 0) AS BIGINT)
    AS n_backoff,
  CAST(coalesce(s.n_bg, 0) - coalesce(s.n_scored, 0) AS BIGINT) AS n_oov,
  CAST(coalesce(s.ssum, 0) AS BIGINT) AS score_sum_e3,
  CASE WHEN s.n_scored > 0
       THEN CAST(s.ssum // s.n_scored AS BIGINT) END AS mean_e3
FROM toks t LEFT JOIN s ON t.doc_id = s.doc_id
"""


def q_good_turing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Good-Turing frequency spectrum over the corpus bigrams (Good
    1953; Gale & Sampson 1995 "simple Good-Turing") — the
    count-of-counts table N_r every smoothing estimator starts from,
    and the discounted counts r* = (r+1)·N_{r+1}/N_r that give the
    unseen-mass estimate (N_1/N is the probability mass of bigrams
    never observed).  Pairs with `kn_bigram_score`: KN is the "what
    discount" answer, this is the raw evidence table; a corpus-health
    reviewer reads a bumpy spectrum as duplication or templating.

    Cross-engine: counts and the spectrum are exact BIGINTs; r* ships
    as rstar_e6 = ((r+1)·N_{r+1}·1e6) DIV N_r (0 when the r+1 class
    is empty — the LEFT JOIN convention), mass = r·N_r.  The bigram
    chain is `_bigrams()`/`_lm_tokens()`, shared with `bigram_lm_score`
    — changing the tokenizer moves both oracles.

    Scale shape: token explode → ONE bigram hash agg (the corpus-sized
    shuffle every n-gram LM pays anyway) → ONE spectrum agg whose key
    count is the number of DISTINCT count values — O(hundreds) at any
    corpus size, so the shifted self-join for N_{r+1} is a broadcast
    over metadata."""
    docs = (
        _docs(spark, sf_dir)
        .select("doc_id", "text")
        .where(F.trim("text") != "")
    )
    bg = docs.select(F.explode(_bigrams()).alias("bg"))
    counts = bg.groupBy("bg").agg(F.count(F.lit(1)).cast("long").alias("r"))
    spec = counts.groupBy("r").agg(
        F.count(F.lit(1)).cast("long").alias("n_r")
    )
    nxt = spec.select(
        (F.col("r") - 1).alias("r"), F.col("n_r").alias("n_r1")
    )
    return (
        spec.join(F.broadcast(nxt), "r", "left")
        .select(
            "r",
            "n_r",
            F.expr(
                "CAST(coalesce(((r + 1) * n_r1 * 1000000) DIV n_r, 0)"
                " AS BIGINT)"
            ).alias("rstar_e6"),
            F.expr("CAST(r * n_r AS BIGINT)").alias("mass"),
        )
    )


# Dunning G² collocation spec — MIRRORED in `_collocations_g2_sql`;
# change together.  G2_MIN_COUNT gates hapax bigrams OUT of the
# ranking (their G² is dominated by the k22 bulk term and ties
# meaninglessly); marginals and N are computed over ALL bigrams
# BEFORE the gate (the cooc_ppmi raw-stream convention).  The four
# G² terms come from `_g2_term` — ONE Python helper spliced into BOTH
# engines (the _heaps_ols_exprs rule: edit the helper, both move).
G2_TOPK = 30
G2_MIN_COUNT = 3


def _g2_term(k: str, a: str, b: str, n: str) -> str:
    """One Dunning G² contingency term k·ln(k·N/(a·b)), e3-floored
    BIGINT, 0 when the cell is empty — spliced verbatim into the
    Spark expression AND the DuckDB oracle so the float op order is
    identical.  Every operand is cast DOUBLE BEFORE multiplying (the
    source_keyness overflow rule — k·N as BIGINT blows past 2^63 at
    ~10^10 bigram tokens); the doubles stay exact to 2^53 ≈ 9·10^15
    tokens.  floor() is toward −∞ on both engines, so negative terms
    (observed < expected cells) agree too."""
    return (
        f"CAST(CASE WHEN ({k}) > 0 THEN floor(CAST(({k}) AS DOUBLE)"
        f" * ln((CAST(({k}) AS DOUBLE) * ({n}))"
        f" / (CAST(({a}) AS DOUBLE) * ({b}))) * 1000.0)"
        f" ELSE 0 END AS BIGINT)"
    )


def q_collocations_g2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dunning log-likelihood-ratio collocations (Dunning 1993,
    "Accurate Methods for the Statistics of Surprise and
    Coincidence") — the classic collocation test that, unlike PMI
    (`cooc_ppmi`), stays calibrated on LOW counts: per bigram type
    the 2×2 contingency of (first token = w1) × (second token = w2)
    over all bigram events, scored G² = 2·Σ k·ln(k·N/(row·col)).
    High-G² pairs are multiword units a tokenizer/phrase-miner should
    treat as single terms; the complement of `cooc_ppmi`'s windowed
    association and `source_keyness`'s corpus-contrast ln-ratio.

    Cross-engine: counts/marginals are exact BIGINTs; each of the
    four G² terms is the `_g2_term` e3-floored one-expression form
    spliced into both engines; g2_e3 = 2·Σ terms is a BIGINT sum, and
    the ranking is (g2_e3 DESC, w1, w2) over the already-exact key.

    Scale shape: token explode → ONE bigram hash agg (the n-gram-LM
    shuffle), two unigram-marginal aggs of THAT table (bounded by
    vocab size), N via the 1-row broadcast-scalar crossJoin, two
    equi-joins back on w1/w2, TakeOrderedAndProject for the top-k.
    No window functions, no driver collect."""
    docs = (
        _docs(spark, sf_dir)
        .select("doc_id", "text")
        .where(F.trim("text") != "")
    )
    cnts = (
        docs.select(F.explode(_bigrams()).alias("bg"))
        .groupBy(
            F.split_part(F.col("bg"), F.lit(" "), F.lit(1)).alias("w1"),
            F.split_part(F.col("bg"), F.lit(" "), F.lit(2)).alias("w2"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("k11"))
    )
    r1 = cnts.groupBy("w1").agg(F.sum("k11").cast("long").alias("row1"))
    c1 = cnts.groupBy("w2").agg(F.sum("k11").cast("long").alias("col1"))
    tot = cnts.agg(F.sum("k11").cast("long").alias("n_tot"))
    full = (
        cnts.join(r1, "w1")
        .join(c1, "w2")
        .crossJoin(F.broadcast(tot))
        .withColumn("k12", F.expr("CAST(row1 - k11 AS BIGINT)"))
        .withColumn("k21", F.expr("CAST(col1 - k11 AS BIGINT)"))
        .withColumn(
            "k22", F.expr("CAST(n_tot - row1 - col1 + k11 AS BIGINT)")
        )
    )
    g2 = (
        F.expr(_g2_term("k11", "row1", "col1", "n_tot"))
        + F.expr(_g2_term("k12", "row1", "n_tot - col1", "n_tot"))
        + F.expr(_g2_term("k21", "n_tot - row1", "col1", "n_tot"))
        + F.expr(_g2_term("k22", "n_tot - row1", "n_tot - col1", "n_tot"))
    )
    return (
        full.where(F.col("k11") >= G2_MIN_COUNT)
        .select(
            "w1",
            "w2",
            "k11",
            F.col("row1").alias("w1_count"),
            F.col("col1").alias("w2_count"),
            (F.lit(2) * g2).cast("long").alias("g2_e3"),
        )
        .orderBy(F.col("g2_e3").desc(), "w1", "w2")
        .limit(G2_TOPK)
    )


def _collocations_g2_sql(
    topk: int = G2_TOPK, min_count: int = G2_MIN_COUNT
) -> str:
    """collocations_g2 oracle: the shared bigram chain, BIGINT
    marginals, the four spliced `_g2_term` expressions (identical
    float op order), (g2_e3 DESC, w1, w2) top-k."""
    return f"""
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '[ \\t\\n\\x0B\\f\\r]+') AS t
  FROM documents WHERE trim(text) <> ''
), bg AS (
  SELECT unnest(list_transform(generate_series(1, len(t) - 1),
                               i -> t[i] || ' ' || t[i+1])) AS bg
  FROM toks
), cnts AS (
  SELECT split_part(bg, ' ', 1) AS w1, split_part(bg, ' ', 2) AS w2,
         CAST(count(*) AS BIGINT) AS k11
  FROM bg GROUP BY 1, 2
), r1 AS (
  SELECT w1, CAST(sum(k11) AS BIGINT) AS row1 FROM cnts GROUP BY 1
), c1 AS (
  SELECT w2, CAST(sum(k11) AS BIGINT) AS col1 FROM cnts GROUP BY 1
), tot AS (
  SELECT CAST(sum(k11) AS BIGINT) AS n_tot FROM cnts
), full_t AS (
  SELECT cnts.w1, cnts.w2, cnts.k11, r1.row1, c1.col1, tot.n_tot,
         CAST(r1.row1 - cnts.k11 AS BIGINT) AS k12,
         CAST(c1.col1 - cnts.k11 AS BIGINT) AS k21,
         CAST(tot.n_tot - r1.row1 - c1.col1 + cnts.k11 AS BIGINT) AS k22
  FROM cnts JOIN r1 USING (w1) JOIN c1 USING (w2) CROSS JOIN tot
)
SELECT w1, w2, k11, row1 AS w1_count, col1 AS w2_count,
       CAST(2 * ({_g2_term("k11", "row1", "col1", "n_tot")}
               + {_g2_term("k12", "row1", "n_tot - col1", "n_tot")}
               + {_g2_term("k21", "n_tot - row1", "col1", "n_tot")}
               + {_g2_term("k22", "n_tot - row1", "n_tot - col1", "n_tot")})
            AS BIGINT) AS g2_e3
FROM full_t WHERE k11 >= {min_count}
ORDER BY g2_e3 DESC, w1, w2 LIMIT {topk}
"""


# Chi-square feature-selection spec — MIRRORED in `_chi2_select_sql`;
# change together.  Document-frequency 2×2 per token vs the
# lang_guess=='en' label (the logreg label — `_scored_feats_ctes`
# consumer); CHI2_MIN_DF gates rare tokens out of the RANKING only.
CHI2_TOPK = 40
CHI2_MIN_DF = 5


def q_chi2_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square token feature selection (the classic χ² test on the
    per-token 2×2 document-frequency contingency vs a binary label —
    Yang & Pedersen 1997's strongest selector): which tokens are most
    predictive of the `logreg_quality` label (lang_guess == 'en')?
    The discrete complement of `source_keyness` (PMI vs a corpus
    split) and the input-side answer to `doc_rarity`; feeds a
    classifier the same way `tfidf_topterms` feeds retrieval.

    Cross-engine: a/b/df/P/N are exact BIGINTs (distinct-token
    explode → hash agg; label totals via the 1-row broadcast-scalar
    crossJoin); det = a·d − b·c is materialized as ONE double column
    (every operand cast DOUBLE before multiplying — the
    source_keyness overflow rule), and chi2_e3 = floor(N·det²/
    ((a+b)(c+d)(a+c)(b+d))·1e3) uses IEEE ×,÷ only — bit-identical
    cross-engine (the graph_modularity class); zero-margin guards
    CASE to 0.  Rank (chi2_e3 DESC, tok), df ≥ CHI2_MIN_DF.

    Scale shape: per-doc array_distinct then explode → ONE token hash
    agg (the inverted-index shuffle class), label totals one scalar
    agg, TakeOrderedAndProject top-k.  No window, no driver collect."""
    docs = (
        _docs(spark, sf_dir)
        .select("doc_id", "text")
        .where(F.trim("text") != "")
    )
    lab = docs.select(
        "doc_id",
        F.when(lang_guess() == "en", F.lit(1))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("y"),
    )
    tok_doc = docs.select(
        "doc_id", F.explode(F.array_distinct(_lm_tokens())).alias("tok")
    )
    cnt = (
        tok_doc.join(lab, "doc_id")
        .groupBy("tok")
        .agg(
            F.sum("y").cast("long").alias("a"),
            F.count(F.lit(1)).cast("long").alias("df"),
        )
    )
    tot = lab.agg(
        F.sum("y").cast("long").alias("p_tot"),
        F.count(F.lit(1)).cast("long").alias("n_docs"),
    )
    return (
        cnt.where(F.col("df") >= CHI2_MIN_DF)
        .crossJoin(F.broadcast(tot))
        .select(
            "tok",
            "df",
            "a",
            F.expr("CAST(df - a AS BIGINT)").alias("b"),
            F.expr("CAST(p_tot - a AS BIGINT)").alias("c"),
            F.expr("CAST(n_docs - p_tot - (df - a) AS BIGINT)").alias("d"),
            "p_tot",
            "n_docs",
        )
        .select(
            "tok",
            "df",
            F.col("a").alias("n_pos"),
            F.col("b").alias("n_neg"),
            F.expr(
                "CAST(CASE WHEN df > 0 AND n_docs - df > 0"
                " AND p_tot > 0 AND n_docs - p_tot > 0 THEN"
                " floor((CAST(n_docs AS DOUBLE)"
                " * (CAST(a AS DOUBLE) * d - CAST(b AS DOUBLE) * c)"
                " * (CAST(a AS DOUBLE) * d - CAST(b AS DOUBLE) * c))"
                " / ((CAST(df AS DOUBLE))"
                " * (CAST(n_docs AS DOUBLE) - df)"
                " * CAST(p_tot AS DOUBLE)"
                " * (CAST(n_docs AS DOUBLE) - p_tot)) * 1000.0)"
                " ELSE 0 END AS BIGINT)"
            ).alias("chi2_e3"),
        )
        .orderBy(F.col("chi2_e3").desc(), "tok")
        .limit(CHI2_TOPK)
    )


def _chi2_select_sql(
    topk: int = CHI2_TOPK, min_df: int = CHI2_MIN_DF
) -> str:
    """chi2_select oracle: the shared `_scored_feats_ctes` label, the
    distinct-token unnest, BIGINT contingency, and the bit-exact
    chi2_e3 expression (identical float op order)."""
    return f"""
WITH {_scored_feats_ctes()},
lab AS (
  SELECT doc_id,
         CAST(CASE WHEN lang_guess = 'en' THEN 1 ELSE 0 END AS BIGINT) AS y
  FROM feats WHERE trim(text) <> ''
), td AS (
  SELECT doc_id, unnest(list_distinct(
           regexp_split_to_array(trim(lower(text)), '[ \\t\\n\\x0B\\f\\r]+')))
           AS tok
  FROM documents WHERE trim(text) <> ''
), cnt AS (
  SELECT tok, CAST(sum(y) AS BIGINT) AS a,
         CAST(count(*) AS BIGINT) AS df
  FROM td JOIN lab USING (doc_id) GROUP BY 1
), tot AS (
  SELECT CAST(sum(y) AS BIGINT) AS p_tot,
         CAST(count(*) AS BIGINT) AS n_docs
  FROM lab
), full_t AS (
  SELECT tok, df, a,
         CAST(df - a AS BIGINT) AS b,
         CAST(p_tot - a AS BIGINT) AS c,
         CAST(n_docs - p_tot - (df - a) AS BIGINT) AS d,
         p_tot, n_docs
  FROM cnt CROSS JOIN tot WHERE df >= {min_df}
)
SELECT tok, df, a AS n_pos, b AS n_neg,
       CAST(CASE WHEN df > 0 AND n_docs - df > 0
                 AND p_tot > 0 AND n_docs - p_tot > 0 THEN
              floor((CAST(n_docs AS DOUBLE)
                     * (CAST(a AS DOUBLE) * d - CAST(b AS DOUBLE) * c)
                     * (CAST(a AS DOUBLE) * d - CAST(b AS DOUBLE) * c))
                    / ((CAST(df AS DOUBLE))
                       * (CAST(n_docs AS DOUBLE) - df)
                       * CAST(p_tot AS DOUBLE)
                       * (CAST(n_docs AS DOUBLE) - p_tot)) * 1000.0)
            ELSE 0 END AS BIGINT) AS chi2_e3
FROM full_t
ORDER BY chi2_e3 DESC, tok LIMIT {topk}
"""


def q_lang_source_cramer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cramér's V association between language and source (Cramér
    1946) — ONE number answering "is language determined by source?"
    for mixture planning: V ≈ 0 means sources are language-balanced
    (stratified sampling can treat them independently), V → 1 means
    language IS source (dedup/mixture decisions must condition on
    it).  The corpus-level summary over the same contingency grid
    `lang_confusion` inspects cell-by-cell.

    Cross-engine: cell/margin counts are exact BIGINTs over the
    bounded lang×source grid; each cell's chi² term (o−e)²/e is IEEE
    ×,÷ on exact doubles, e6-FLOORED PER CELL before the exact BIGINT
    sum (the burrows sum-order rule); V = sqrt(chi2/(N·(k−1))) is
    IEEE sqrt/÷ on the floored sum — bit-identical cross-engine.

    Scale shape: ONE corpus-scale hash agg onto the bounded grid;
    margins/N and the fold all run on metadata-scale tables; one-row
    output."""
    docs = _docs(spark, sf_dir).select("lang", "source")
    cells = docs.groupBy("lang", "source").agg(
        F.count(F.lit(1)).cast("long").alias("o")
    )
    rl = cells.groupBy("lang").agg(F.sum("o").cast("long").alias("row_n"))
    cs = cells.groupBy("source").agg(
        F.sum("o").cast("long").alias("col_n")
    )
    tot = cells.agg(
        F.sum("o").cast("long").alias("n_docs"),
        F.countDistinct("lang").cast("long").alias("n_langs"),
        F.countDistinct("source").cast("long").alias("n_sources"),
    )
    terms = (
        cells.join(rl, "lang")
        .join(cs, "source")
        .crossJoin(F.broadcast(tot))
        .select(
            F.expr(
                "CAST(floor(((CAST(o AS DOUBLE)"
                " - (CAST(row_n AS DOUBLE) * col_n) / n_docs)"
                " * (CAST(o AS DOUBLE)"
                " - (CAST(row_n AS DOUBLE) * col_n) / n_docs))"
                " / ((CAST(row_n AS DOUBLE) * col_n) / n_docs)"
                " * 1000000.0) AS BIGINT)"
            ).alias("term_e6")
        )
    )
    chi = terms.agg(F.sum("term_e6").cast("long").alias("chi2_e6"))
    return chi.crossJoin(F.broadcast(tot)).select(
        "n_docs",
        "n_langs",
        "n_sources",
        "chi2_e6",
        F.expr(
            "CAST(CASE WHEN least(n_langs, n_sources) > 1 THEN"
            " floor(sqrt((CAST(chi2_e6 AS DOUBLE) / 1000000.0)"
            " / (CAST(n_docs AS DOUBLE)"
            " * (least(n_langs, n_sources) - 1))) * 1000000.0)"
            " ELSE 0 END AS BIGINT)"
        ).alias("v_e6"),
    )


_LANG_SOURCE_CRAMER_SQL = """
WITH cells AS (
  SELECT lang, source, CAST(count(*) AS BIGINT) AS o
  FROM documents GROUP BY 1, 2
), rl AS (
  SELECT lang, CAST(sum(o) AS BIGINT) AS row_n FROM cells GROUP BY 1
), cs AS (
  SELECT source, CAST(sum(o) AS BIGINT) AS col_n FROM cells GROUP BY 1
), tot AS (
  SELECT CAST(sum(o) AS BIGINT) AS n_docs,
         CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
         CAST(count(DISTINCT source) AS BIGINT) AS n_sources
  FROM cells
), terms AS (
  SELECT CAST(floor(((CAST(c.o AS DOUBLE)
                      - (CAST(r.row_n AS DOUBLE) * s.col_n) / t.n_docs)
                     * (CAST(c.o AS DOUBLE)
                        - (CAST(r.row_n AS DOUBLE) * s.col_n) / t.n_docs))
                    / ((CAST(r.row_n AS DOUBLE) * s.col_n) / t.n_docs)
                    * 1000000.0) AS BIGINT) AS term_e6
  FROM cells c JOIN rl r USING (lang) JOIN cs s USING (source)
       CROSS JOIN tot t
), chi AS (
  SELECT CAST(sum(term_e6) AS BIGINT) AS chi2_e6 FROM terms
)
SELECT t.n_docs, t.n_langs, t.n_sources, c.chi2_e6,
       CAST(CASE WHEN least(t.n_langs, t.n_sources) > 1 THEN
              floor(sqrt((CAST(c.chi2_e6 AS DOUBLE) / 1000000.0)
                         / (CAST(t.n_docs AS DOUBLE)
                            * (least(t.n_langs, t.n_sources) - 1)))
                    * 1000000.0)
            ELSE 0 END AS BIGINT) AS v_e6
FROM chi c CROSS JOIN tot t
"""


# Token-burstiness spec — MIRRORED in `_token_burstiness_sql`;
# change together.  BURST_MIN_CF gates the ranking (cf==df==1 hapaxes
# all tie at burst 0); ranking is (burst_e3 DESC, tok).
BURST_TOPK = 30
BURST_MIN_CF = 5


def q_token_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token burstiness (Church & Gale 1995 "Poisson mixtures"; Katz
    1996): content words CLUMP — once a token appears in a document
    it tends to repeat — while function words spread Poisson-thin.
    Per token: corpus frequency cf, document frequency df, burst =
    ln(cf/df) (0 for never-repeating tokens), Katz's adaptation
    probability P(repeat | occurs) = (cf−df)/cf, and the mean
    occurrences per containing doc.  The burstiness ranking is a
    stopword-free content-word detector — the distributional
    complement of `doc_rarity` (IDF) and `chi2_select` (label
    association); a template/boilerplate corpus lights up with
    extreme burst values.

    Cross-engine: cf/df/katz/mu are exact BIGINTs from one
    (doc, tok) hash agg; burst_e3 = floor(ln(CAST(cf AS DOUBLE) /
    CAST(df AS DOUBLE))·1e3) is the established ln-floor class on an
    integer rational (the source_keyness rule — one expression, cast
    before divide); rank (burst_e3 DESC, tok), cf ≥ BURST_MIN_CF.

    Scale shape: token explode → ONE (doc, tok) hash agg (the
    inverted-index shuffle) → ONE token agg → TakeOrderedAndProject
    top-k.  No window, no collect, no distinct-count."""
    docs = (
        _docs(spark, sf_dir)
        .select("doc_id", "text")
        .where(F.trim("text") != "")
    )
    dt = (
        docs.select("doc_id", F.explode(_lm_tokens()).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    per = dt.groupBy("tok").agg(
        F.sum("c").cast("long").alias("cf"),
        F.count(F.lit(1)).cast("long").alias("df"),
    )
    return (
        per.where(F.col("cf") >= BURST_MIN_CF)
        .select(
            "tok",
            "cf",
            "df",
            F.expr(
                "CAST(floor(ln(CAST(cf AS DOUBLE) / CAST(df AS DOUBLE))"
                " * 1000.0) AS BIGINT)"
            ).alias("burst_e3"),
            F.expr("CAST(((cf - df) * 1000000) DIV cf AS BIGINT)").alias(
                "katz_e6"
            ),
            F.expr("CAST((cf * 1000) DIV df AS BIGINT)").alias("mu_e3"),
        )
        .orderBy(F.col("burst_e3").desc(), "tok")
        .limit(BURST_TOPK)
    )


def _token_burstiness_sql(
    topk: int = BURST_TOPK, min_cf: int = BURST_MIN_CF
) -> str:
    """token_burstiness oracle: identical (doc, tok) agg chain, the
    one-expression ln floor, exact BIGINT katz/mu, same ranking."""
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(
    regexp_split_to_array(trim(lower(text)), '[ \\t\\n\\x0B\\f\\r]+')) AS tok
  FROM documents WHERE trim(text) <> ''
), dt AS (
  SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS c
  FROM toks GROUP BY 1, 2
), per AS (
  SELECT tok, CAST(sum(c) AS BIGINT) AS cf,
         CAST(count(*) AS BIGINT) AS df
  FROM dt GROUP BY 1
)
SELECT tok, cf, df,
       CAST(floor(ln(CAST(cf AS DOUBLE) / CAST(df AS DOUBLE)) * 1000.0)
            AS BIGINT) AS burst_e3,
       CAST(((cf - df) * 1000000) // cf AS BIGINT) AS katz_e6,
       CAST((cf * 1000) // df AS BIGINT) AS mu_e3
FROM per WHERE cf >= {min_cf}
ORDER BY burst_e3 DESC, tok LIMIT {topk}
"""


# Burrows' Delta spec — MIRRORED in `_burrows_delta_sql`; change
# together.  BURROWS_K marker words by (cnt DESC, tok) corpus rank,
# collected as literals (the best_snippet vocab rule).
BURROWS_K = 20


def q_source_burrows_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burrows' Delta stylometric distance between sources (Burrows
    2002 "'Delta': a Measure of Stylistic Difference"; the standard
    authorship-attribution metric): z-score each source's relative
    frequency of the top-``BURROWS_K`` marker words against the
    across-source distribution, then Δ(a,b) = mean_t |z_a − z_b|.
    The STYLE complement of the content-drift family (source_kl =
    token distribution, source_centroid_sim = embeddings, this =
    function-word fingerprint — near-invariant to topic).

    Cross-engine: per-source marker frequencies are exact e6 BIGINTs
    ((c_st·1e6) DIV tot_s); per-token across-source moments are exact
    BIGINT sums over the DENSIFIED (source × marker) grid (missing
    pairs coalesce to 0 — skipping them would bias μ/σ); z is IEEE
    ÷/sqrt on exact doubles (bit-exact, the graph_modularity class)
    with a σ>0 CASE guard; each |z_a − z_b| is e6-FLOORED to BIGINT
    BEFORE the pair sum, so the sum is exact and ORDER-FREE (a raw
    double Σ would be sum-order-sensitive — the one float trap this
    family must avoid); delta_e6 = sum DIV K.

    Scale shape: two corpus-scale hash aggs ((source, tok) counts +
    per-source totals); everything after runs on the bounded
    sources×K grid — the marker list ships as collected literals
    (metadata-scale), the densify is a pure explode map, the pair
    self-join is bounded² — no corpus-scale window or collect."""
    docs = (
        _docs(spark, sf_dir)
        .select("source", "text")
        .where(F.trim("text") != "")
    )
    toks = docs.select("source", F.explode(_lm_tokens()).alias("tok"))
    vocab_rows = (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), "tok")
        .limit(BURROWS_K)
        .collect()
    )
    markers = sorted(r["tok"] for r in vocab_rows)
    st = (
        toks.where(F.col("tok").isin(markers))
        .groupBy("source", "tok")
        .agg(F.count(F.lit(1)).cast("long").alias("c_st"))
    )
    tot = toks.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("tot_s")
    )
    grid = tot.select(
        "source",
        "tot_s",
        F.explode(F.array(*[F.lit(m) for m in markers])).alias("tok"),
    )
    freq = (
        grid.join(st, ["source", "tok"], "left")
        .select(
            "source",
            "tok",
            F.expr(
                "CAST((coalesce(c_st, 0) * 1000000) DIV tot_s AS BIGINT)"
            ).alias("f_e6"),
        )
        .localCheckpoint(eager=False)
    )
    stats = freq.groupBy("tok").agg(
        F.count(F.lit(1)).cast("long").alias("n_src"),
        F.sum("f_e6").cast("long").alias("sum_f"),
        F.sum(F.expr("f_e6 * f_e6")).cast("long").alias("sum_f2"),
    )
    z = freq.join(F.broadcast(stats), "tok").select(
        "source",
        "tok",
        F.expr(
            "CASE WHEN (CAST(sum_f2 AS DOUBLE)"
            " - (CAST(sum_f AS DOUBLE) * sum_f) / n_src) > 0.0 THEN"
            " (CAST(f_e6 AS DOUBLE) - CAST(sum_f AS DOUBLE) / n_src)"
            " / sqrt((CAST(sum_f2 AS DOUBLE)"
            " - (CAST(sum_f AS DOUBLE) * sum_f) / n_src) / n_src)"
            " ELSE 0.0 END"
        ).alias("z"),
    )
    a, b = z.alias("a"), z.alias("b")
    return (
        a.join(
            b,
            (F.col("a.tok") == F.col("b.tok"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_terms"),
            F.sum(
                F.expr("CAST(floor(abs(a.z - b.z) * 1000000.0) AS BIGINT)")
            )
            .cast("long")
            .alias("sum_dz_e6"),
        )
        .select(
            "source_a",
            "source_b",
            "n_terms",
            "sum_dz_e6",
            F.expr("CAST(sum_dz_e6 DIV n_terms AS BIGINT)").alias(
                "delta_e6"
            ),
        )
    )


def _burrows_delta_sql(k: int = BURROWS_K) -> str:
    """source_burrows_delta oracle: vocab by (cnt DESC, tok) top-K,
    densified grid via CROSS JOIN, exact e6 frequencies/moments, the
    bit-exact z expression, per-term e6 floors before the pair sum."""
    return f"""
WITH toks AS MATERIALIZED (
  SELECT source, unnest(
    regexp_split_to_array(trim(lower(text)), '[ \\t\\n\\x0B\\f\\r]+')) AS tok
  FROM documents WHERE trim(text) <> ''
), vocab AS (
  SELECT tok FROM (
    SELECT tok, count(*) AS cnt FROM toks GROUP BY 1
    ORDER BY cnt DESC, tok LIMIT {k})
), st AS (
  SELECT source, tok, CAST(count(*) AS BIGINT) AS c_st
  FROM toks WHERE tok IN (SELECT tok FROM vocab) GROUP BY 1, 2
), tot AS (
  SELECT source, CAST(count(*) AS BIGINT) AS tot_s FROM toks GROUP BY 1
), grid AS (
  SELECT t.source, t.tot_s, v.tok FROM tot t CROSS JOIN vocab v
), freq AS (
  SELECT g.source, g.tok,
         CAST((coalesce(s.c_st, 0) * 1000000) // g.tot_s AS BIGINT) AS f_e6
  FROM grid g LEFT JOIN st s ON g.source = s.source AND g.tok = s.tok
), stats AS (
  SELECT tok, CAST(count(*) AS BIGINT) AS n_src,
         CAST(sum(f_e6) AS BIGINT) AS sum_f,
         CAST(sum(f_e6 * f_e6) AS BIGINT) AS sum_f2
  FROM freq GROUP BY 1
), z AS (
  SELECT f.source, f.tok,
         CASE WHEN (CAST(s.sum_f2 AS DOUBLE)
                    - (CAST(s.sum_f AS DOUBLE) * s.sum_f) / s.n_src) > 0.0
              THEN (CAST(f.f_e6 AS DOUBLE)
                    - CAST(s.sum_f AS DOUBLE) / s.n_src)
                   / sqrt((CAST(s.sum_f2 AS DOUBLE)
                           - (CAST(s.sum_f AS DOUBLE) * s.sum_f) / s.n_src)
                          / s.n_src)
              ELSE 0.0 END AS z
  FROM freq f JOIN stats s USING (tok)
)
SELECT a.source AS source_a, b.source AS source_b,
       CAST(count(*) AS BIGINT) AS n_terms,
       CAST(sum(CAST(floor(abs(a.z - b.z) * 1000000.0) AS BIGINT))
            AS BIGINT) AS sum_dz_e6,
       CAST(sum(CAST(floor(abs(a.z - b.z) * 1000000.0) AS BIGINT))
            // count(*) AS BIGINT) AS delta_e6
FROM z a JOIN z b ON a.tok = b.tok AND a.source < b.source
GROUP BY 1, 2
"""


# Min-K% Prob fraction denominator (k = ceil(n_in / MINK_DEN), i.e.
# the lowest 20% of token log-probs) — MIRRORED in the `min_k_prob`
# oracle SQL; change together.
MINK_DEN = 5


def q_min_k_prob(
    spark: SparkSession, sf_dir: str, vocab_k: int = BIGRAM_VOCAB_K
) -> DataFrame:
    """Min-K% Prob membership-inference audit (Shi et al., ICLR 2024
    "Detecting Pretraining Data from Large Language Models"): score a
    document by the MEAN of its k% LOWEST token log-probabilities
    under the reference LM — memorized/member text has no deep
    low-probability valleys, so a high min-k score flags likely
    training-set membership.  The probability-based complement of the
    n-gram-overlap `contamination` query: overlap catches verbatim
    leakage, min-k catches memorization where the surface form
    drifted.

    Cross-engine: the per-bigram log-probs are the `_bigram_vocab`
    top-K conditionals (Python math.log literals vs DuckDB ln() are
    only ulp-close, the bigram_lm_score precedent); sorting is safe
    because distinct (c2, c1) count pairs give ratios separated far
    above ln() ulp, and equal ratios give byte-identical doubles —
    interchangeable under the sum.  k_used = ceil(n_in / MINK_DEN)
    is exact-int ((n_in + MINK_DEN-1) DIV MINK_DEN), and the mean is
    3-dp STABLE rounded (the avg_logprob discipline).

    Scale shape: vocab is the two bounded hash aggs shipped as a
    LITERAL map; per-doc scoring is a pure map over the JVM-built
    bigram array (array_sort + slice + in-order fold) — zero
    exchanges, no token explode (the lm_score_broadcast family)."""
    docs = _docs(spark, sf_dir).select("doc_id", "text")
    vocab = _bigram_vocab(docs, vocab_k)
    lp_map = F.create_map(*[F.lit(x) for kv in vocab.items() for x in kv])
    bi = _bigrams()
    lps = F.array_sort(
        F.filter(
            F.transform(bi, lambda b: lp_map[b]), lambda x: x.isNotNull()
        )
    )
    base = (
        docs.where(F.trim("text") != "")
        .select(
            "doc_id",
            F.size(bi).cast("long").alias("n_bigrams"),
            lps.alias("lps"),
        )
        .withColumn("n_in", F.size("lps").cast("long"))
        .withColumn(
            "k_used",
            F.expr(
                "CAST(CASE WHEN n_in > 0 THEN"
                f" (n_in + {MINK_DEN - 1}) DIV {MINK_DEN}"
                " ELSE 0 END AS BIGINT)"
            ),
        )
    )
    mean_low = F.aggregate(
        F.expr("slice(lps, 1, k_used)"),
        F.lit(0.0),
        lambda a, x: a + x,
    ) / F.col("k_used").cast("double")
    return base.select(
        "doc_id",
        "n_bigrams",
        "n_in",
        "k_used",
        F.when(F.col("n_in") > 0, round3_stable(mean_low)).alias(
            "mink_score"
        ),
    )


# DoReMi constants — MIRRORED in `_doremi_sql`; change together.  The
# EG update is computed on EXACT integers wherever sums cross rows
# (per-doc logprobs enter as e3 BIGINTs, the normalizer sums e9
# BIGINTs) so fold order cannot diverge the engines; the only floats
# are products/quotients of identical values on both sides.  ETA is
# large because the synthetic sources' excess-loss spread is narrow
# (~0.33-0.35 nats); production corpora use the paper's smaller steps.
DOREMI_ETA = 10.0
DOREMI_ITERS = 3
DOREMI_SMOOTH_NUM = 1
DOREMI_SMOOTH_DEN = 5


def q_doremi_weights(
    spark: SparkSession, sf_dir: str, vocab_k: int = 30
) -> DataFrame:
    """DoReMi domain reweighting (Xie et al. 2023, arXiv:2305.10429):
    exponentiated-gradient updates of per-domain mixture weights
    proportional to each domain's EXCESS LOSS — how much worse the
    proxy model does than the reference model on that domain — then
    uniform smoothing.  Here the reference model is the corpus bigram
    LM and the proxy the corpus unigram LM (the reference is strictly
    the stronger model, the paper's setup): per-doc excess loss =
    max(0, avg_lp_bigram − avg_lp_unigram) in e3-integer nats, using
    the exact per-doc quantities the green `lm_score` /
    `bigram_lm_score` oracles already prove cross-engine.  Deviation,
    documented: the paper recomputes excess loss as the proxy trains;
    this engine computes the data-side reweighting for a FIXED pair of
    models, so per-domain excess is static across the unrolled
    iterations.  Output: one row per (source, iter) for iter 0..ITERS
    plus the final uniform-smoothed row at iter ITERS+1.

    Cross-engine determinism: per-domain sums are BIGINT e3 (exact,
    order-free); mean excess = two exact ints divided (identical
    double); each EG step floors w·exp(η·mx)·1e9 to BIGINT before the
    exact-integer normalizer sum, so w_t is a ratio of identical
    integers on both engines.  exp() is the one libm call — same glibc
    here; a portability ulp at the e9 floor boundary is the accepted
    improbable class (CLAUDE.md rounding discipline).

    Scale shape: three bounded vocab aggs (top-K unigrams/bigrams +
    left-word counts, the lm_score/bigram shapes), ONE scoring pass
    with a per-source hash agg, then the EG loop on the collected
    ≤|domains|-row table driver-side (metadata-scale — the logreg
    precedent) and a literal-scale createDataFrame."""
    import math

    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    docs = _docs(spark, sf_dir).select("doc_id", "source", "text")
    live = docs.where(F.trim("text") != "")
    txt = docs.select("doc_id", "text")
    uvocab = _lm_vocab(txt, vocab_k)
    bvocab = _bigram_vocab(txt, vocab_k)

    toks = _lm_tokens()
    ulp_map = F.create_map(*[F.lit(x) for kv in uvocab.items() for x in kv])
    ulp = F.filter(
        F.transform(toks, lambda t: ulp_map[t]), lambda x: x.isNotNull()
    )
    un = F.size(ulp)
    u_e3 = F.floor(
        F.aggregate(ulp, F.lit(0.0), lambda a, x: a + x)
        / un.cast("double")
        * 1000.0
        + F.lit(0.5)
    ).cast("long")

    blp_map = F.create_map(*[F.lit(x) for kv in bvocab.items() for x in kv])
    bi = _bigrams()
    blp = F.filter(
        F.transform(bi, lambda b: blp_map[b]), lambda x: x.isNotNull()
    )
    bn = F.size(blp)
    b_e3 = F.floor(
        F.aggregate(blp, F.lit(0.0), lambda a, x: a + x)
        / bn.cast("double")
        * 1000.0
        + F.lit(0.5)
    ).cast("long")

    dom = (
        live.select(
            "source",
            u_e3.alias("u_e3"),
            b_e3.alias("b_e3"),
            un.alias("u_n"),
            bn.alias("b_n"),
        )
        .where((F.col("u_n") > 0) & (F.col("b_n") > 0))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(
                F.greatest(F.lit(0).cast("long"), F.col("b_e3") - F.col("u_e3"))
            )
            .cast("long")
            .alias("sum_excess_e3"),
        )
        .collect()  # metadata-scale: one row per domain
    )

    d = len(dom)
    mx = {r["source"]: r["sum_excess_e3"] / (r["n_docs"] * 1000.0) for r in dom}
    w = {r["source"]: 1.0 / d for r in dom}
    info = {r["source"]: (r["n_docs"], r["sum_excess_e3"]) for r in dom}

    def emit(it: int, weights: dict[str, float]) -> list[tuple]:
        return [
            (s, info[s][0], info[s][1], it, math.floor(x * 1e6 + 0.5) / 1e6)
            for s, x in weights.items()
        ]

    out = emit(0, w)
    for t in range(1, DOREMI_ITERS + 1):
        ue = {
            s: math.floor((w[s] * math.exp(DOREMI_ETA * mx[s])) * 1e9 + 0.5)
            for s in w
        }
        z = float(sum(ue.values()))  # exact-int sum, then one conversion
        w = {s: ue[s] / z for s in w}
        out += emit(t, w)
    c = DOREMI_SMOOTH_NUM / float(DOREMI_SMOOTH_DEN)
    out += emit(
        DOREMI_ITERS + 1, {s: (1.0 - c) * w[s] + c / d for s in w}
    )

    schema = StructType(
        [
            StructField("source", StringType()),
            StructField("n_docs", LongType()),
            StructField("sum_excess_e3", LongType()),
            StructField("iter", LongType()),
            StructField("weight", DoubleType()),
        ]
    )
    return spark.createDataFrame(out, schema)


# Filter-cascade gate constants — MIRRORED in `_filter_cascade_sql`;
# change together.  Thresholds compare STABLE-ROUNDED 5-dp fractions
# (identical doubles on both engines) against literal doubles, so the
# comparisons cannot diverge cross-engine.
CASCADE_MIN_TOKENS = 5
CASCADE_DUP_WORD_MAX = 0.3
CASCADE_TOP2_MAX = 0.2
CASCADE_DUP3_MAX = 0.2
CASCADE_MIN_QUALITY = 0.35

# (name, ordinal) of every gate, in evaluation order; 'kept' gets
# ordinal len(_CASCADE_GATES).  The oracle CASE mirrors this order.
_CASCADE_GATES = (
    "empty",
    "too_short",
    "lang_unknown",
    "dup_words",
    "top2gram",
    "dup3gram",
    "low_quality",
)


def cascade_columns() -> tuple[F.Column, F.Column]:
    """(verdict, stage) CaseWhen pair — the gate cascade as pure
    per-row expressions, shared by `q_filter_cascade` (per-doc funnel)
    and `q_source_funnel` (per-source accounting)."""
    from rxtls_spark.functions.text import repetition_features

    r = repetition_features()
    conds = {
        "empty": F.trim(F.col("text")) == "",
        "too_short": token_count() < CASCADE_MIN_TOKENS,
        "lang_unknown": lang_guess() == "und",
        "dup_words": round5_stable(r["dup_word_frac"])
        > CASCADE_DUP_WORD_MAX,
        "top2gram": round5_stable(r["top2gram_char_frac"]) > CASCADE_TOP2_MAX,
        "dup3gram": round5_stable(r["dup3gram_char_frac"]) > CASCADE_DUP3_MAX,
        "low_quality": quality_score() < CASCADE_MIN_QUALITY,
    }
    verdict = None
    stage = None
    for i, name in enumerate(_CASCADE_GATES):
        c = conds[name]
        verdict = (
            F.when(c, F.lit(name)) if verdict is None else verdict.when(c, F.lit(name))
        )
        stage = F.when(c, F.lit(i)) if stage is None else stage.when(c, F.lit(i))
    return (
        verdict.otherwise(F.lit("kept")),
        stage.otherwise(F.lit(len(_CASCADE_GATES))).cast("long"),
    )


def q_filter_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FineWeb/RefinedWeb-style quality-filter FUNNEL as one
    operator: every doc flows through the ordered gate cascade (empty →
    too-short → unknown-language → Gopher repetition trio → composite
    quality floor) and reports the FIRST gate that rejects it, or
    'kept' — the per-stage accounting a curation pipeline publishes as
    its data-funnel table (reference analog: the usability funnel of
    P1/P4/P5 re-expressed over documents; thresholds adapted from
    Rae et al. 2021 §A1.1).

    Scale shape: the ENTIRE cascade is a single Catalyst projection —
    every signal (token counts, lang-ID marker scores, repetition
    run-length folds, composite quality) is a per-row expression, so
    the plan is scan → project with ZERO exchanges, no UDF, no window
    (plan-locked); at 100 TB it fuses into one whole-stage-codegen
    pass over the corpus.  CaseWhen also short-circuits: docs failing
    cheap early gates never evaluate the repetition folds."""
    verdict, stage = cascade_columns()
    return _docs(spark, sf_dir).select(
        "doc_id",
        "lang",
        verdict.alias("verdict"),
        stage.alias("stage"),
    )


def q_source_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-SOURCE filter-funnel report — the "which crawls/feeds are
    worth keeping" table a curation team reviews: for every (source,
    verdict) cell, the doc count and its share of that source's docs.
    Composes the `filter_cascade` gate expressions with the grouped
    accounting (the reference's per-log operator tallies, A6,
    re-expressed over document sources).

    Scale shape: the cascade stays a pure projection, then ONE
    partial-agg exchange on (source, verdict); per-source totals
    derive from the already-bounded funnel table (n_sources × 8 rows)
    and join back as a broadcast — the corpus is touched exactly
    once."""
    verdict, _ = cascade_columns()
    docs = _docs(spark, sf_dir).select(
        "source", verdict.alias("verdict")
    )
    counts = docs.groupBy("source", "verdict").agg(
        F.count(F.lit(1)).alias("n")
    )
    totals = counts.groupBy("source").agg(F.sum("n").alias("total"))
    return counts.join(F.broadcast(totals), "source").select(
        "source",
        "verdict",
        F.col("n").cast("long").alias("n"),
        (F.col("n").cast("double") / F.col("total").cast("double")).alias(
            "share"
        ),
    )


# n-gram novelty constant — MIRRORED in `_ngram_novelty_sql`; change
# together.
NOVELTY_W = 5


def _word_ngram_col(w: int) -> F.Column:
    """JVM-side array of w-word shingles over `_lm_tokens()` (strict
    concat — never concat_ws, whose null-skipping would silently
    shorten a gram)."""
    toks = _lm_tokens()
    head = F.slice(toks, 1, F.greatest(F.size(toks) - (w - 1), F.lit(0)))
    return F.transform(
        head,
        lambda t, i: F.concat(
            t, *[x for j in range(1, w) for x in (F.lit(" "), F.get(toks, i + j))]
        ),
    )


def q_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document n-gram NOVELTY: the fraction of a doc's distinct
    ``NOVELTY_W``-word shingles that appear in NO other document — the
    diversity/uniqueness signal data-selection pipelines use alongside
    dedup (dedup asks "is this a copy?", novelty asks "does this add
    anything?").  Distinct from `ngram_jaccard` (pairwise similarity
    on candidate pairs) and `span_dedup` (first-occurrence rewrite).

    Scale shape: distinct (doc, gram) pairs [exchange 1] → gram-keyed
    doc-frequency agg [exchange 2] → gram equi-join back → per-doc agg
    [exchange 3] — the span_dedup class of gram-keyed shuffles; at
    100 TB the gram key is hashed (xxh3) instead of carried as text,
    which only strengthens the equi-join.  Novelty = n_novel/n_grams
    is an exact rational double on both engines."""
    docs = _docs(spark, sf_dir).select("doc_id", "text").where(
        F.trim("text") != ""
    )
    pairs = (
        docs.select(
            "doc_id", F.explode(_word_ngram_col(NOVELTY_W)).alias("gram")
        )
        .distinct()
    )
    dfc = pairs.groupBy("gram").agg(F.count(F.lit(1)).alias("n_docs"))
    per = (
        pairs.join(dfc, "gram")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(F.when(F.col("n_docs") == 1, 1).otherwise(0)).alias(
                "n_novel"
            ),
        )
    )
    return per.select(
        "doc_id",
        F.col("n_grams").cast("long").alias("n_grams"),
        F.col("n_novel").cast("long").alias("n_novel"),
        (F.col("n_novel").cast("double") / F.col("n_grams").cast("double")).alias(
            "novelty"
        ),
    )


# Curriculum constants — MIRRORED in the `curriculum_order` oracle SQL;
# change together.  Stage thresholds are INTEGER comparisons on the
# exact 1e-5 quality numerator (the quality_bucket() rationale), never
# float compares on quality itself.
CURRICULUM_HI_FROM = 70000  # quality >= 0.70 → stage 0
CURRICULUM_MID_FROM = 40000  # quality >= 0.40 → stage 1, else 2


def q_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum schedule: assign every doc a quality STAGE
    (high-quality first — the warm-up data — then mid, then tail) and
    a deterministic position within (stage, shard), giving the exact
    traversal order (stage asc, shard asc, pos asc) a curriculum
    training job replays — `shuffle_shards` composed with a quality
    staging, the curriculum-learning counterpart of `mixture_sample`'s
    temperature reweighting.

    Scale shape: stage assignment is a pure map (integer compare on
    the exact quality numerator); position is a per-(stage, shard)
    row_number — sharding inside each stage keeps the window
    partition count at 3×``SHUFFLE_N_SHARDS`` and each partition at
    corpus/48, so no stage becomes one giant sort (the skew trap a
    bare PARTITION BY stage would be at 100 TB).  ONE exchange total,
    no UDF (plan-locked)."""
    from pyspark.sql.window import Window

    docs = _docs(spark, sf_dir).select(
        "doc_id", quality_score().alias("quality")
    )
    qnum = F.floor(F.col("quality") * F.lit(100000.0) + F.lit(0.5)).cast(
        "long"
    )
    stage = (
        F.when(qnum >= CURRICULUM_HI_FROM, F.lit(0))
        .when(qnum >= CURRICULUM_MID_FROM, F.lit(1))
        .otherwise(F.lit(2))
    )
    key = knuth_hash(F.col("doc_id"))
    keyed = docs.select(
        "doc_id",
        "quality",
        stage.alias("stage"),
        key.alias("order_key"),
        (key % F.lit(SHUFFLE_N_SHARDS)).alias("shard"),
    )
    w = Window.partitionBy("stage", "shard").orderBy("order_key", "doc_id")
    return keyed.select(
        "doc_id",
        F.col("stage").cast("long").alias("stage"),
        F.col("shard").cast("long").alias("shard"),
        (F.row_number().over(w) - 1).cast("long").alias("pos"),
        F.col("order_key").cast("long").alias("order_key"),
        "quality",
    )


# --- similarity -----------------------------------------------------------------

def q_ann_brute_force(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    return brute_force_topk(emb, query_set(emb), k=10)


# Margin-based bitext mining: neighborhood size + source-pool sampling
# modulus — MIRRORED in the `bitext_mine` oracle SQL; change together.
BITEXT_K = 4
BITEXT_SRC_MOD = 5


def q_bitext_mine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Margin-based bitext mining (Artetxe & Schwenk 2019, the
    CCMatrix/LASER alignment rule): for every English source doc in
    the deterministic query pool (lang='en' AND doc_id %
    ``BITEXT_SRC_MOD`` == 0), score every non-English candidate by
    the RATIO margin — cos(x,y) normalized by the mean of the two
    directions' ``BITEXT_K``-nearest-neighborhood cosines — and emit
    the top-1 candidate per source.  Margin beats raw cosine because
    it cancels hubness: a y that is everyone's neighbor has a high
    denominator and stops winning.

    Exact-integer discipline: cosines are the e5 floor (the
    ann_brute_force convention; doc_id==vec_id is the
    documents↔embeddings correspondence), neighborhood means are
    sum(cos_e5) DIV K (truncation toward zero agrees between Spark
    DIV and DuckDB //), margin_e6 = (2*cos_e5*1e6) DIV
    (ax_e5+ay_e5) with non-positive denominators excluded on both
    engines — every ranked quantity is a BIGINT.

    Scale shape: the x-pool is the metadata-scale query set, so the
    pair matrix is ONE BroadcastNestedLoopJoin (no shuffle to build
    it); the two rank windows + the top-1 window partition by
    x_id/y_id — keys that scale with the corpus.  At 100 TB the same
    margin arithmetic feeds from ann_ivf_topk candidate lists
    instead of the dense matrix (the documented IVF scale path).
    Reference analog: A8 min/max summaries + O3 deterministic top-k
    (/root/reference/internal/core/domain_extractor.go) composed
    into a retrieval scorer."""
    from pyspark.sql.window import Window

    from rxtls_spark.operators.similarity import cosine_expr

    docs = _docs(spark, sf_dir).select("doc_id", "lang")
    emb = _emb(spark, sf_dir)
    de = docs.join(
        emb, docs["doc_id"] == emb["vec_id"]
    ).select("doc_id", "lang", "embedding")
    x = de.where(
        (F.col("lang") == "en")
        & (F.col("doc_id") % BITEXT_SRC_MOD == 0)
    ).select(
        F.col("doc_id").alias("x_id"), F.col("embedding").alias("x_emb")
    )
    y = de.where(F.col("lang") != "en").select(
        F.col("doc_id").alias("y_id"),
        F.col("lang").alias("y_lang"),
        F.col("embedding").alias("y_emb"),
    )
    pairs = (
        y.crossJoin(F.broadcast(x))
        .select(
            "x_id",
            "y_id",
            "y_lang",
            F.floor(cosine_expr("x_emb", "y_emb") * 100000)
            .cast("long")
            .alias("cos_e5"),
        )
        .localCheckpoint(eager=False)
    )
    wx = Window.partitionBy("x_id").orderBy(F.desc("cos_e5"), "y_id")
    wy = Window.partitionBy("y_id").orderBy(F.desc("cos_e5"), "x_id")
    ranked = pairs.withColumn("rx", F.row_number().over(wx)).withColumn(
        "ry", F.row_number().over(wy)
    )
    ax = (
        ranked.where(F.col("rx") <= BITEXT_K)
        .groupBy("x_id")
        .agg(
            F.expr(f"CAST(sum(cos_e5) DIV {BITEXT_K} AS BIGINT)").alias(
                "ax_e5"
            )
        )
    )
    ay = (
        ranked.where(F.col("ry") <= BITEXT_K)
        .groupBy("y_id")
        .agg(
            F.expr(f"CAST(sum(cos_e5) DIV {BITEXT_K} AS BIGINT)").alias(
                "ay_e5"
            )
        )
    )
    m = (
        pairs.join(F.broadcast(ax), "x_id")
        .join(F.broadcast(ay), "y_id")
        .where(F.col("ax_e5") + F.col("ay_e5") > 0)
        .withColumn(
            "margin_e6",
            F.expr(
                "CAST((2 * cos_e5 * 1000000) DIV (ax_e5 + ay_e5)"
                " AS BIGINT)"
            ),
        )
    )
    wtop = Window.partitionBy("x_id").orderBy(F.desc("margin_e6"), "y_id")
    return (
        m.withColumn("rn", F.row_number().over(wtop))
        .where(F.col("rn") == 1)
        .select("x_id", "y_id", "y_lang", "cos_e5", "margin_e6")
    )


def q_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Injected-copy retrieval through the LSH index: every query
    vector's exact copy (vec_id+1e6) shares all its buckets and has the
    maximum cosine, so it MUST appear in the top-k — oracle-checkable
    even though bucket membership isn't SQL-expressible.  Top-k recall
    vs brute force stays locked by tests/test_similarity.py."""
    from rxtls_spark.operators.embedding_dedup import with_injected_embedding_dups
    from rxtls_spark.operators.similarity import cosine_expr

    emb = _emb(spark, sf_dir)
    qs = query_set(emb)
    topk = ann_lsh_topk(with_injected_embedding_dups(emb), qs, k=10)
    hits = topk.where(
        F.col("neighbor_id") == F.col("q_id") + F.lit(1_000_000)
    ).select("q_id", F.lit(1).alias("hit"))
    expected = emb.where(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("q_id"),
        (F.col("vec_id") + F.lit(1_000_000)).alias("copy_id"),
        F.col("embedding").alias("emb_a"),
        F.col("embedding").alias("emb_b"),
    )
    return (
        expected.withColumn(
            "sim_e5", F.floor(cosine_expr("emb_a", "emb_b") * 100000).cast("long")
        )
        .join(hits, "q_id", "left")
        .select(
            "q_id",
            "copy_id",
            "sim_e5",
            F.coalesce(F.col("hit"), F.lit(0)).cast("long").alias("recovered"),
        )
    )


def q_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Injected-copy retrieval through the IVF index with TRAINED
    k-means centroids: an exact copy has an identical vector, hence the
    same argmax cell, and the query always probes its own nearest cell
    — so recovery is structural for ANY quantizer, like ann_lsh.
    Training runs once here (the offline step) and the centroids are
    passed into the query; recall vs brute force is pytest-locked."""
    from rxtls_spark.operators.embedding_dedup import with_injected_embedding_dups
    from rxtls_spark.operators.similarity import (
        ann_ivf_topk,
        cosine_expr,
        train_ivf_centroids,
    )

    emb = _emb(spark, sf_dir)
    qs = query_set(emb)
    corpus = with_injected_embedding_dups(emb)
    cents = train_ivf_centroids(corpus, k=16, iters=3)
    topk = ann_ivf_topk(corpus, qs, k=10, n_probe=2, centroids=cents)
    hits = topk.where(
        F.col("neighbor_id") == F.col("q_id") + F.lit(1_000_000)
    ).select("q_id", F.lit(1).alias("hit"))
    expected = emb.where(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("q_id"),
        (F.col("vec_id") + F.lit(1_000_000)).alias("copy_id"),
        F.col("embedding").alias("emb_a"),
        F.col("embedding").alias("emb_b"),
    )
    return (
        expected.withColumn(
            "sim_e5", F.floor(cosine_expr("emb_a", "emb_b") * 100000).cast("long")
        )
        .join(hits, "q_id", "left")
        .select(
            "q_id",
            "copy_id",
            "sim_e5",
            F.coalesce(F.col("hit"), F.lit(0)).cast("long").alias("recovered"),
        )
    )


def q_ann_ivf_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Injected-copy retrieval through IVF-PQ + exact re-rank: the copy
    shares the query's argmax cell (structural, as in ann_ivf), its PQ
    codes are identical to the query's own encoding so its asymmetric
    score is at the top of the candidate set, and the exact re-rank
    then ranks it first.  Codebooks + centroids train once here (the
    offline step).  Exactness of the rerank machinery is pytest-locked
    (full probe + full rerank == brute force)."""
    from rxtls_spark.operators.embedding_dedup import with_injected_embedding_dups
    from rxtls_spark.operators.similarity import (
        ann_ivf_pq_topk,
        cosine_expr,
        train_ivf_centroids,
        train_pq,
    )

    emb = _emb(spark, sf_dir)
    qs = query_set(emb)
    corpus = with_injected_embedding_dups(emb)
    cents = train_ivf_centroids(corpus, k=16, iters=3)
    books = train_pq(corpus, m=8, ks=16, iters=2)
    topk = ann_ivf_pq_topk(
        corpus, qs, k=10, n_probe=2, rerank=50, centroids=cents, codebooks=books
    )
    hits = topk.where(
        F.col("neighbor_id") == F.col("q_id") + F.lit(1_000_000)
    ).select("q_id", F.lit(1).alias("hit"))
    expected = emb.where(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("q_id"),
        (F.col("vec_id") + F.lit(1_000_000)).alias("copy_id"),
        F.col("embedding").alias("emb_a"),
        F.col("embedding").alias("emb_b"),
    )
    return (
        expected.withColumn(
            "sim_e5", F.floor(cosine_expr("emb_a", "emb_b") * 100000).cast("long")
        )
        .join(hits, "q_id", "left")
        .select(
            "q_id",
            "copy_id",
            "sim_e5",
            F.coalesce(F.col("hit"), F.lit(0)).cast("long").alias("recovered"),
        )
    )


# k-means spec shared by the Spark query and the unrolled SQL oracle —
# change together (the oracle is generated from these).
KMEANS_K = 8
KMEANS_ITERS = 3
KMEANS_DIM = 64

# ANN recall-eval constants — MIRRORED in `_ann_recall_sql`; change
# together.  The quantizer spec is the kmeans one so the oracle can
# reuse `_kmeans_cents_ctes` verbatim.
ANN_EVAL_K = 10
ANN_EVAL_NPROBE = 2


def q_ann_recall_eval(
    spark: SparkSession,
    sf_dir: str,
    n_probe: int = ANN_EVAL_NPROBE,
    topk: int = ANN_EVAL_K,
) -> DataFrame:
    """Recall@k of the IVF index against the exact brute-force anchor —
    the evaluation harness an ANN deployment publishes before anyone
    trusts its candidate generation ("measure, don't guess" applied to
    the index itself).  Per query: how many of the true top-k cosine
    neighbors does an ``ANN_EVAL_NPROBE``-cell probe of the
    deterministic Lloyd's quantizer (the `kmeans` spec: K=8, L2,
    Knuth-hash seeds, 6-dp stable means — so the oracle reuses the
    unrolled centroid CTEs) actually return?

    Scale shape: centroids are literals; corpus cell assignment is a
    per-row JVM argmin (no join); candidates come from a cell equi-join
    against the BROADCAST exploded query probes — the corpus is never
    cross-joined.  The exact anchor IS a brute-force pass, which is the
    point: it runs over the eval query SAMPLE (1% of vectors), not
    query×corpus at serving rate.  Ranking uses floor(sim*1e5) with
    neighbor_id tie-break — the cross-engine-stable ANN discipline."""
    from pyspark.sql.window import Window

    from rxtls_spark.operators.similarity import (
        cosine_expr,
        ivf_assign_expr,
        ivf_probe_expr,
        train_ivf_centroids,
    )

    emb = _emb(spark, sf_dir)
    cents = train_ivf_centroids(
        emb,
        k=KMEANS_K,
        iters=KMEANS_ITERS,
        metric="l2",
        seed_order=knuth_hash(F.col("vec_id")),
        round_dp=6,
    )
    qs = query_set(emb)
    emb_cells = emb.select(
        "vec_id",
        "embedding",
        ivf_assign_expr(cents, F.col("embedding"), metric="l2").alias("cell"),
    )
    q_cells = qs.select(
        "q_id",
        "q_emb",
        F.explode(
            ivf_probe_expr(cents, F.col("q_emb"), n_probe, metric="l2")
        ).alias("cell"),
    )
    sim_e5 = F.floor(cosine_expr("embedding", "q_emb") * 100000).cast("long")
    w = Window.partitionBy("q_id").orderBy(
        F.col("sim_e5").desc(), F.col("neighbor_id").asc()
    )
    approx = (
        emb_cells.join(F.broadcast(q_cells), "cell")
        .where(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id", F.col("vec_id").alias("neighbor_id"), sim_e5.alias("sim_e5")
        )
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= topk)
        .select("q_id", "neighbor_id")
    )
    exact = brute_force_topk(emb, qs, k=topk).select(
        "q_id", "neighbor_id"
    )
    hits = (
        approx.join(exact, ["q_id", "neighbor_id"])
        .groupBy("q_id")
        .agg(F.count(F.lit(1)).alias("n_hit"))
    )
    return qs.select("q_id").join(hits, "q_id", "left").select(
        "q_id",
        F.coalesce(F.col("n_hit"), F.lit(0)).cast("long").alias("n_hit"),
        (
            F.coalesce(F.col("n_hit"), F.lit(0)).cast("double")
            / F.lit(float(topk))
        ).alias("recall"),
    )


def _ndcg_weights(topk: int = ANN_EVAL_K) -> list[int]:
    """Integer DCG rank-discount weights w_r = floor(1e6 / log2(r+1)),
    computed ONCE in Python and spliced as literals into BOTH engines
    (the bm25 idf-literal precedent taken further: no cross-engine
    log() at all — the whole NDCG chain is BIGINT)."""
    import math

    return [math.floor(1e6 / math.log2(r + 1)) for r in range(1, topk + 1)]


def q_ndcg_eval(
    spark: SparkSession,
    sf_dir: str,
    n_probe: int = ANN_EVAL_NPROBE,
    topk: int = ANN_EVAL_K,
) -> DataFrame:
    """NDCG@k of the IVF index — the GRADED companion to
    `ann_recall_eval` (recall asks "did the right ids come back?";
    NDCG asks "did the most similar ones come back FIRST?", which is
    what a retrieval consumer actually experiences).  Per query: the
    probed list's discounted cumulative gain over the exact
    brute-force ideal, gain = the neighbor's true e5-floored cosine
    clamped at 0 (the mmr greatest(0,·) precedent — negative cosines
    must not reward ranking).

    Cross-engine exactness: rank discounts are the INTEGER literals
    ``_ndcg_weights`` (floor(1e6/log2(r+1)) — computed once in
    Python, spliced into both engines, so no engine log anywhere);
    dcg_num = Σ gain·w_r ≤ k·1e11 and ndcg_e6 = (dcg_num·1e6) DIV
    idcg_num stay exact BIGINTs (products < 2^63 at any corpus size —
    per-query lists are k-bounded); candidate ranking is the
    recall-eval (sim_e5 DESC, neighbor_id) discipline.

    Scale shape: identical to `ann_recall_eval` — literal centroids,
    per-row JVM argmin assignment, broadcast probe equi-join, exact
    anchor over the 1% query sample only; the NDCG fold adds one
    k-row-per-query agg on each side."""
    from pyspark.sql.window import Window

    from rxtls_spark.operators.similarity import (
        cosine_expr,
        ivf_assign_expr,
        ivf_probe_expr,
        train_ivf_centroids,
    )

    emb = _emb(spark, sf_dir)
    cents = train_ivf_centroids(
        emb,
        k=KMEANS_K,
        iters=KMEANS_ITERS,
        metric="l2",
        seed_order=knuth_hash(F.col("vec_id")),
        round_dp=6,
    )
    qs = query_set(emb)
    emb_cells = emb.select(
        "vec_id",
        "embedding",
        ivf_assign_expr(cents, F.col("embedding"), metric="l2").alias("cell"),
    )
    q_cells = qs.select(
        "q_id",
        "q_emb",
        F.explode(
            ivf_probe_expr(cents, F.col("q_emb"), n_probe, metric="l2")
        ).alias("cell"),
    )
    sim_e5 = F.floor(cosine_expr("embedding", "q_emb") * 100000).cast("long")
    w = Window.partitionBy("q_id").orderBy(
        F.col("sim_e5").desc(), F.col("neighbor_id").asc()
    )
    warr = F.array(*[F.lit(x) for x in _ndcg_weights(topk)])
    contrib = (
        F.greatest(F.col("sim_e5"), F.lit(0))
        * F.element_at(warr, F.col("rn").cast("int"))
    ).cast("long")
    approx = (
        emb_cells.join(F.broadcast(q_cells), "cell")
        .where(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id", F.col("vec_id").alias("neighbor_id"), sim_e5.alias("sim_e5")
        )
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= topk)
    )
    dcg = approx.select("q_id", contrib.alias("c")).groupBy("q_id").agg(
        F.sum("c").cast("long").alias("dcg_num")
    )
    exact = brute_force_topk(emb, qs, k=topk).select(
        "q_id", "sim_e5", F.col("rank").alias("rn")
    )
    idcg = exact.select("q_id", contrib.alias("c")).groupBy("q_id").agg(
        F.sum("c").cast("long").alias("idcg_num")
    )
    return (
        qs.select("q_id")
        .join(dcg, "q_id", "left")
        .join(idcg, "q_id", "left")
        .select(
            "q_id",
            F.coalesce("dcg_num", F.lit(0).cast("long")).alias("dcg_num"),
            F.coalesce("idcg_num", F.lit(0).cast("long")).alias("idcg_num"),
        )
        .select(
            "q_id",
            "dcg_num",
            "idcg_num",
            F.when(
                F.col("idcg_num") > 0,
                F.expr("(dcg_num * 1000000) DIV idcg_num"),
            )
            .otherwise(F.lit(0))
            .cast("long")
            .alias("ndcg_e6"),
        )
    )


def q_map_eval(
    spark: SparkSession,
    sf_dir: str,
    n_probe: int = ANN_EVAL_NPROBE,
    topk: int = ANN_EVAL_K,
) -> DataFrame:
    """MAP@k of the IVF index — the third retrieval metric on the
    shared eval chain (`ann_recall_eval` = did the right ids return,
    `ndcg_eval` = graded order quality, this = the BINARY order
    metric: average precision over the probed ranking, relevance =
    membership in the exact brute-force top-k).  AP punishes a
    relevant hit by how late it arrives — two indexes with equal
    recall separate the moment one buries its hits at the tail.

    Cross-engine exactness: pure BIGINT — rel flags from the
    (q_id, neighbor_id) equi-join, the running hit count from a
    k-bounded window, per-hit precision terms (cum·1e6) DIV rn
    floored PER TERM before the exact sum (the burrows per-term-floor
    rule: a float Σ would be order-sensitive), ap_e6 = ap_num DIV
    topk — the R=k MAP@k convention, so empty-probe queries score 0
    instead of dropping out.

    Scale shape: identical to `ann_recall_eval` — literal centroids,
    per-row JVM argmin, broadcast probe equi-join, the exact anchor
    over the 1% query sample only; AP adds one k-row window + agg."""
    from pyspark.sql.window import Window

    from rxtls_spark.operators.similarity import (
        cosine_expr,
        ivf_assign_expr,
        ivf_probe_expr,
        train_ivf_centroids,
    )

    emb = _emb(spark, sf_dir)
    cents = train_ivf_centroids(
        emb,
        k=KMEANS_K,
        iters=KMEANS_ITERS,
        metric="l2",
        seed_order=knuth_hash(F.col("vec_id")),
        round_dp=6,
    )
    qs = query_set(emb)
    emb_cells = emb.select(
        "vec_id",
        "embedding",
        ivf_assign_expr(cents, F.col("embedding"), metric="l2").alias("cell"),
    )
    q_cells = qs.select(
        "q_id",
        "q_emb",
        F.explode(
            ivf_probe_expr(cents, F.col("q_emb"), n_probe, metric="l2")
        ).alias("cell"),
    )
    sim_e5 = F.floor(cosine_expr("embedding", "q_emb") * 100000).cast("long")
    w = Window.partitionBy("q_id").orderBy(
        F.col("sim_e5").desc(), F.col("neighbor_id").asc()
    )
    approx = (
        emb_cells.join(F.broadcast(q_cells), "cell")
        .where(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id", F.col("vec_id").alias("neighbor_id"), sim_e5.alias("sim_e5")
        )
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= topk)
        .select("q_id", "neighbor_id", "rn")
    )
    exact = brute_force_topk(emb, qs, k=topk).select(
        "q_id", "neighbor_id", F.lit(1).cast("long").alias("rel")
    )
    wcum = (
        Window.partitionBy("q_id")
        .orderBy("rn")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    marked = (
        approx.join(exact, ["q_id", "neighbor_id"], "left")
        .select(
            "q_id",
            "rn",
            F.coalesce("rel", F.lit(0).cast("long")).alias("rel"),
        )
        .withColumn("cum", F.sum("rel").over(wcum).cast("long"))
        .withColumn(
            "term",
            F.expr(
                "CAST(CASE WHEN rel = 1 THEN (cum * 1000000) DIV rn"
                " ELSE 0 END AS BIGINT)"
            ),
        )
    )
    per_q = marked.groupBy("q_id").agg(
        F.sum("rel").cast("long").alias("n_hit"),
        F.sum("term").cast("long").alias("ap_num"),
    )
    return (
        qs.select("q_id")
        .join(per_q, "q_id", "left")
        .select(
            "q_id",
            F.coalesce("n_hit", F.lit(0).cast("long")).alias("n_hit"),
            F.coalesce("ap_num", F.lit(0).cast("long")).alias("ap_num"),
            F.expr(
                f"CAST(coalesce(ap_num, 0) DIV {topk} AS BIGINT)"
            ).alias("ap_e6"),
        )
    )


def _map_eval_sql(
    k: int = KMEANS_K,
    iters: int = KMEANS_ITERS,
    dim: int = KMEANS_DIM,
    topk: int = ANN_EVAL_K,
    n_probe: int = ANN_EVAL_NPROBE,
) -> str:
    """MAP@k oracle: the recall-eval CTE chain carrying rn on the
    probed list, rel via left join against the exact set, the
    k-bounded running-hit window, per-term (cum·1e6)//rn floors, and
    ap_e6 = Σ // topk."""
    ctes = _kmeans_cents_ctes(k, iters, dim)
    return (
        "WITH "
        + ",\n".join(ctes)
        + f""",
asg AS (
  SELECT vec_id, emb, cell FROM (
    SELECT e.vec_id, e.emb, c.cell,
      row_number() OVER (PARTITION BY e.vec_id
                         ORDER BY list_distance(e.emb, c.centroid), c.cell
      ) AS rn
    FROM e, cents{iters} c)
  WHERE rn = 1
), q AS (
  SELECT vec_id AS q_id, emb AS q_emb FROM e WHERE vec_id % 100 = 0
), probe AS (
  SELECT q_id, q_emb, cell FROM (
    SELECT q.q_id, q.q_emb, c.cell,
      row_number() OVER (PARTITION BY q.q_id
                         ORDER BY list_distance(q.q_emb, c.centroid), c.cell
      ) AS rn
    FROM q, cents{iters} c)
  WHERE rn <= {n_probe}
), approx AS (
  SELECT q_id, neighbor_id, rn FROM (
    SELECT q_id, neighbor_id,
      row_number() OVER (PARTITION BY q_id
                         ORDER BY sim_e5 DESC, neighbor_id) AS rn
    FROM (
      SELECT p.q_id, a.vec_id AS neighbor_id,
        CAST(floor(list_cosine_similarity(a.emb, p.q_emb) * 100000)
             AS BIGINT) AS sim_e5
      FROM probe p JOIN asg a ON p.cell = a.cell
      WHERE a.vec_id <> p.q_id))
  WHERE rn <= {topk}
), exact AS (
  SELECT q_id, neighbor_id FROM (
    SELECT q.q_id, e.vec_id AS neighbor_id,
      row_number() OVER (PARTITION BY q.q_id
        ORDER BY CAST(floor(list_cosine_similarity(e.emb, q.q_emb) * 100000)
                      AS BIGINT) DESC, e.vec_id) AS rn
    FROM e, q WHERE e.vec_id <> q.q_id)
  WHERE rn <= {topk}
), marked AS (
  SELECT a.q_id, a.rn,
         CAST(CASE WHEN x.neighbor_id IS NULL THEN 0 ELSE 1 END AS BIGINT)
           AS rel
  FROM approx a LEFT JOIN exact x
    ON a.q_id = x.q_id AND a.neighbor_id = x.neighbor_id
), cums AS (
  SELECT q_id, rn, rel,
         CAST(sum(rel) OVER (PARTITION BY q_id ORDER BY rn
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) AS BIGINT) AS cum
  FROM marked
), per_q AS (
  SELECT q_id, CAST(sum(rel) AS BIGINT) AS n_hit,
         CAST(sum(CASE WHEN rel = 1 THEN (cum * 1000000) // rn
                       ELSE 0 END) AS BIGINT) AS ap_num
  FROM cums GROUP BY 1
)
SELECT q.q_id,
       CAST(coalesce(p.n_hit, 0) AS BIGINT) AS n_hit,
       CAST(coalesce(p.ap_num, 0) AS BIGINT) AS ap_num,
       CAST(coalesce(p.ap_num, 0) // {topk} AS BIGINT) AS ap_e6
FROM q LEFT JOIN per_q p ON q.q_id = p.q_id
"""
    )


# Matryoshka-eval spec — MIRRORED in `_matryoshka_sql`; change
# together.  MRL_DIM is the truncation prefix (dims 1..16 of the
# 64-dim embedding — the MRL "use the first k dims" contract).
MRL_DIM = 16


def q_matryoshka_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka truncation evaluation (Kusupati et al., NeurIPS
    2022 "Matryoshka Representation Learning"): how much retrieval
    quality survives when the 64-dim embedding is truncated to its
    first ``MRL_DIM`` dims — the memory/recall trade every
    vector-store deployment prices before shipping short vectors.
    Per query (the 1% eval sample): overlap@k between the exact
    full-dim top-k and the exact prefix-dim top-k, their Jaccard,
    and where the TRUE top-1 lands in the prefix ranking (0 = lost).

    Cross-engine: both rankings are the e5-floored-cosine
    (sim DESC, neighbor_id) discipline; the prefix side slices dims
    1..MRL_DIM on both engines (Spark slice ↔ DuckDB emb[1:d]);
    overlap/jaccard/top1 are pure BIGINT joins of the two k-bounded
    lists.

    Scale shape: two brute-force passes over the BROADCAST query
    sample (map-side streams, per-query top-k aggregates — the
    ann_recall_eval anchor shape; the corpus is never self-joined);
    everything after runs on 2·k rows per query."""
    from rxtls_spark.operators.similarity import (
        brute_force_topk,
        query_set,
    )

    emb = _emb(spark, sf_dir)
    qs = query_set(emb)
    full = brute_force_topk(emb, qs, k=ANN_EVAL_K).select(
        "q_id", "neighbor_id", F.col("rank").alias("rn_full")
    )
    emb_p = emb.select(
        "vec_id", F.expr(f"slice(embedding, 1, {MRL_DIM})").alias("embedding")
    )
    qs_p = qs.select(
        "q_id", F.expr(f"slice(q_emb, 1, {MRL_DIM})").alias("q_emb")
    )
    pre = brute_force_topk(emb_p, qs_p, k=ANN_EVAL_K).select(
        "q_id", "neighbor_id", F.col("rank").alias("rn_pre")
    )
    ov = (
        full.join(pre, ["q_id", "neighbor_id"])
        .groupBy("q_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_overlap"))
    )
    t1 = (
        full.where(F.col("rn_full") == 1)
        .join(pre, ["q_id", "neighbor_id"], "left")
        .select(
            "q_id",
            F.coalesce("rn_pre", F.lit(0).cast("long")).alias(
                "top1_pre_rank"
            ),
        )
    )
    return (
        qs.select("q_id")
        .join(ov, "q_id", "left")
        .join(t1, "q_id", "left")
        .select(
            "q_id",
            F.coalesce("n_overlap", F.lit(0).cast("long")).alias(
                "n_overlap"
            ),
            F.expr(
                "CAST((coalesce(n_overlap, 0) * 1000000)"
                f" DIV (2 * {ANN_EVAL_K} - coalesce(n_overlap, 0))"
                " AS BIGINT)"
            ).alias("jaccard_e6"),
            F.coalesce("top1_pre_rank", F.lit(0).cast("long")).alias(
                "top1_pre_rank"
            ),
        )
    )


def _matryoshka_sql(d: int = MRL_DIM, topk: int = ANN_EVAL_K) -> str:
    """matryoshka_eval oracle: the e/q CTEs, both e5-floored ranked
    lists (full vs emb[1:d] prefix), BIGINT overlap/jaccard/top1."""
    return f"""
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
  FROM embeddings
), q AS (
  SELECT vec_id AS q_id, emb AS q_emb FROM e WHERE vec_id % 100 = 0
), fullr AS (
  SELECT q_id, neighbor_id, rn FROM (
    SELECT q.q_id, e.vec_id AS neighbor_id,
      row_number() OVER (PARTITION BY q.q_id
        ORDER BY CAST(floor(list_cosine_similarity(e.emb, q.q_emb) * 100000)
                      AS BIGINT) DESC, e.vec_id) AS rn
    FROM e, q WHERE e.vec_id <> q.q_id)
  WHERE rn <= {topk}
), prer AS (
  SELECT q_id, neighbor_id, rn FROM (
    SELECT q.q_id, e.vec_id AS neighbor_id,
      row_number() OVER (PARTITION BY q.q_id
        ORDER BY CAST(floor(list_cosine_similarity(
                   e.emb[1:{d}], q.q_emb[1:{d}]) * 100000)
                      AS BIGINT) DESC, e.vec_id) AS rn
    FROM e, q WHERE e.vec_id <> q.q_id)
  WHERE rn <= {topk}
), ov AS (
  SELECT f.q_id, CAST(count(*) AS BIGINT) AS n_overlap
  FROM fullr f JOIN prer p
    ON f.q_id = p.q_id AND f.neighbor_id = p.neighbor_id
  GROUP BY 1
), t1 AS (
  SELECT f.q_id,
         CAST(coalesce(min(p.rn), 0) AS BIGINT) AS top1_pre_rank
  FROM fullr f LEFT JOIN prer p
    ON f.q_id = p.q_id AND f.neighbor_id = p.neighbor_id
  WHERE f.rn = 1 GROUP BY 1
)
SELECT q.q_id,
       CAST(coalesce(o.n_overlap, 0) AS BIGINT) AS n_overlap,
       CAST((coalesce(o.n_overlap, 0) * 1000000)
            // (2 * {topk} - coalesce(o.n_overlap, 0)) AS BIGINT)
         AS jaccard_e6,
       CAST(coalesce(t.top1_pre_rank, 0) AS BIGINT) AS top1_pre_rank
FROM q LEFT JOIN ov o ON q.q_id = o.q_id
       LEFT JOIN t1 t ON q.q_id = t.q_id
"""


def q_quantized_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval cost of int8 scalar quantization — the eval that
    prices `embedding_quantize`'s 4× storage cut in RECALL terms
    (quantize told you the MSE; this tells you what the ANN consumer
    actually loses): per query, overlap/Jaccard/top-1 agreement
    between exact full-precision top-k and top-k over the
    DEQUANTIZED store (symmetric setting — queries quantized too,
    the worst honest case).  The third member of the truncation-eval
    family (matryoshka_eval = fewer dims, this = fewer bits,
    ann_recall_eval = fewer probes).

    Cross-engine: the per-dim [lo, hi] grid and the code/dequant
    arithmetic are the embedding_quantize spec verbatim (identical
    doubles — engine round() agreement on these operands is already
    driver-proven there); both rankings are the e5-floored-cosine
    (sim DESC, id) discipline; overlap/jaccard/top1 pure BIGINT.

    Scale shape: one min/max agg (metadata-scale literals), dequant
    is a pure map, then two broadcast brute-force anchor passes over
    the 1% query sample (the matryoshka_eval shape)."""
    from rxtls_spark.operators.similarity import (
        brute_force_topk,
        query_set,
    )

    emb = _emb(spark, sf_dir)
    dim = 64
    aggs = []
    for i in range(dim):
        x = F.element_at("embedding", i + 1).cast("double")
        aggs += [F.min(x).alias(f"lo{i}"), F.max(x).alias(f"hi{i}")]
    b = emb.agg(*aggs).collect()[0]
    lo = [b[f"lo{i}"] for i in range(dim)]
    hi = [b[f"hi{i}"] for i in range(dim)]

    def dequant(i: int):
        x = F.element_at("embedding", i + 1).cast("double")
        span = hi[i] - lo[i]
        if span == 0.0:
            return F.lit(lo[i])
        code = (F.round((x - F.lit(lo[i])) / F.lit(span) * 255) - 128).cast(
            "int"
        )
        return (code + 128).cast("double") / 255.0 * F.lit(span) + F.lit(
            lo[i]
        )

    deq = F.array(*[dequant(i) for i in range(dim)])
    emb_q = emb.select("vec_id", deq.alias("embedding"))
    full = brute_force_topk(emb, query_set(emb), k=ANN_EVAL_K).select(
        "q_id", "neighbor_id", F.col("rank").alias("rn_full")
    )
    qnt = brute_force_topk(emb_q, query_set(emb_q), k=ANN_EVAL_K).select(
        "q_id", "neighbor_id", F.col("rank").alias("rn_q")
    )
    ov = (
        full.join(qnt, ["q_id", "neighbor_id"])
        .groupBy("q_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_overlap"))
    )
    t1 = (
        full.where(F.col("rn_full") == 1)
        .join(qnt, ["q_id", "neighbor_id"], "left")
        .select(
            "q_id",
            F.coalesce("rn_q", F.lit(0).cast("long")).alias("top1_q_rank"),
        )
    )
    return (
        query_set(emb)
        .select("q_id")
        .join(ov, "q_id", "left")
        .join(t1, "q_id", "left")
        .select(
            "q_id",
            F.coalesce("n_overlap", F.lit(0).cast("long")).alias(
                "n_overlap"
            ),
            F.expr(
                "CAST((coalesce(n_overlap, 0) * 1000000)"
                f" DIV (2 * {ANN_EVAL_K} - coalesce(n_overlap, 0))"
                " AS BIGINT)"
            ).alias("jaccard_e6"),
            F.coalesce("top1_q_rank", F.lit(0).cast("long")).alias(
                "top1_q_rank"
            ),
        )
    )


def _quantized_recall_sql(topk: int | None = None) -> str:
    """quantized_recall oracle: the embedding_quantize stats/dequant
    chain rebuilt into per-row DOUBLE arrays (list(... ORDER BY i)),
    then the matryoshka two-ranking comparison."""
    topk = ANN_EVAL_K if topk is None else topk
    return f"""
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
  FROM embeddings
), stats AS MATERIALIZED (
  SELECT i, min(emb[i]) AS lo, max(emb[i]) AS hi
  FROM e, generate_series(1, 64) t(i)
  GROUP BY i
), deq AS MATERIALIZED (
  SELECT e.vec_id,
         list(CASE WHEN s.hi = s.lo THEN s.lo
              ELSE (CAST(round((e.emb[t.i] - s.lo) / (s.hi - s.lo) * 255)
                         - 128 AS INTEGER) + 128) / 255.0 * (s.hi - s.lo)
                   + s.lo END ORDER BY t.i) AS emb
  FROM e, generate_series(1, 64) t(i)
  JOIN stats s ON s.i = t.i
  GROUP BY e.vec_id
), q AS (
  SELECT vec_id AS q_id, emb AS q_emb FROM e WHERE vec_id % 100 = 0
), qq AS (
  SELECT vec_id AS q_id, emb AS q_emb FROM deq WHERE vec_id % 100 = 0
), fullr AS (
  SELECT q_id, neighbor_id, rn FROM (
    SELECT q.q_id, e.vec_id AS neighbor_id,
      row_number() OVER (PARTITION BY q.q_id
        ORDER BY CAST(floor(list_cosine_similarity(e.emb, q.q_emb) * 100000)
                      AS BIGINT) DESC, e.vec_id) AS rn
    FROM e, q WHERE e.vec_id <> q.q_id)
  WHERE rn <= {topk}
), qr AS (
  SELECT q_id, neighbor_id, rn FROM (
    SELECT q.q_id, d.vec_id AS neighbor_id,
      row_number() OVER (PARTITION BY q.q_id
        ORDER BY CAST(floor(list_cosine_similarity(d.emb, q.q_emb) * 100000)
                      AS BIGINT) DESC, d.vec_id) AS rn
    FROM deq d, qq q WHERE d.vec_id <> q.q_id)
  WHERE rn <= {topk}
), ov AS (
  SELECT f.q_id, CAST(count(*) AS BIGINT) AS n_overlap
  FROM fullr f JOIN qr p
    ON f.q_id = p.q_id AND f.neighbor_id = p.neighbor_id
  GROUP BY 1
), t1 AS (
  SELECT f.q_id,
         CAST(coalesce(min(p.rn), 0) AS BIGINT) AS top1_q_rank
  FROM fullr f LEFT JOIN qr p
    ON f.q_id = p.q_id AND f.neighbor_id = p.neighbor_id
  WHERE f.rn = 1 GROUP BY 1
)
SELECT q.q_id,
       CAST(coalesce(o.n_overlap, 0) AS BIGINT) AS n_overlap,
       CAST((coalesce(o.n_overlap, 0) * 1000000)
            // (2 * {topk} - coalesce(o.n_overlap, 0)) AS BIGINT)
         AS jaccard_e6,
       CAST(coalesce(t.top1_q_rank, 0) AS BIGINT) AS top1_q_rank
FROM q LEFT JOIN ov o ON q.q_id = o.q_id
       LEFT JOIN t1 t ON q.q_id = t.q_id
"""


# Rocchio pseudo-relevance-feedback spec — MIRRORED in
# `_rocchio_sql`; change together.  Feedback set = bm25 rank ≤
# ROCCHIO_R (BM25_* constants flow in via the spliced `_bm25_sql`);
# α/β are e3 integers, rank (score_e3 DESC, tok).
ROCCHIO_R = 10
ROCCHIO_TOPK = 15
ROCCHIO_ALPHA_E3 = 1000
ROCCHIO_BETA_E3 = 750


def q_rocchio_expand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rocchio pseudo-relevance-feedback query expansion (Rocchio
    1971 via Salton; the PRF form of Buckley et al., TREC-3): take
    the `bm25_topk` query's top-``ROCCHIO_R`` hits AS IF relevant,
    pool their term frequencies, and emit the expansion vocabulary
    w(t) = α·[t ∈ query] + β·(tf̄_t · idf_t) — the terms a search
    stack adds to the query on the second pass.  Completes the IR
    family: bm25 ranks, rrf fuses rankings, this feeds the ranking
    BACK into the query.

    Cross-engine: sum_tf/df/N are exact BIGINTs; fb_e3 =
    floor((sum_tf/R)·ln(N/df)·1e3) is ONE expression with every
    operand cast DOUBLE before the fold (ln-floor class on integer
    rationals — the token_burstiness form; df ≥ 1 because feedback
    docs are corpus docs); score_e3 = α·is_q + (β·fb_e3) DIV 1000 is
    pure BIGINT; is_q re-derives the SAME (cnt DESC, tok) query-term
    ranking on both engines; final rank (score_e3 DESC, tok).

    Scale shape: the bm25 pass (0-exchange scoring +
    TakeOrderedAndProject) → an R-row broadcast semi-join → one
    bounded feedback-vocab agg; corpus df is ONE distinct-token hash
    agg joined against the BROADCAST feedback vocabulary; N via the
    1-row broadcast-scalar crossJoin; top-k via
    TakeOrderedAndProject."""
    docs = (
        _docs(spark, sf_dir)
        .select("doc_id", "text")
        .where(F.trim("text") != "")
    )
    toks = _lm_tokens()
    qterms = [
        r["tok"]
        for r in docs.select(F.explode(toks).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.col("c").desc(), "tok")
        .limit(BM25_N_TERMS)
        .collect()
    ]
    fb_ids = (
        q_bm25_topk(spark, sf_dir)
        .where(F.col("rank") <= ROCCHIO_R)
        .select("doc_id")
    )
    fb_tf = (
        docs.join(F.broadcast(fb_ids), "doc_id")
        .select(F.explode(toks).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("long").alias("sum_tf"))
    )
    df_t = (
        docs.select(F.explode(F.array_distinct(toks)).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("long").alias("df"))
    )
    nn = docs.agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    qarr = F.array(*[F.lit(t) for t in qterms])
    return (
        df_t.join(F.broadcast(fb_tf), "tok")
        .crossJoin(F.broadcast(nn))
        .select(
            "tok",
            F.array_contains(qarr, F.col("tok"))
            .cast("long")
            .alias("is_q"),
            "sum_tf",
            "df",
            F.expr(
                f"CAST(floor((CAST(sum_tf AS DOUBLE) / {ROCCHIO_R}.0)"
                " * ln(CAST(n_docs AS DOUBLE) / CAST(df AS DOUBLE))"
                " * 1000.0) AS BIGINT)"
            ).alias("fb_e3"),
        )
        .select(
            "tok",
            "is_q",
            "sum_tf",
            "df",
            "fb_e3",
            F.expr(
                f"CAST({ROCCHIO_ALPHA_E3} * is_q"
                f" + ({ROCCHIO_BETA_E3} * fb_e3) DIV 1000 AS BIGINT)"
            ).alias("score_e3"),
        )
        .orderBy(F.col("score_e3").desc(), "tok")
        .limit(ROCCHIO_TOPK)
    )


def _rocchio_sql(
    r: int = ROCCHIO_R,
    topk: int = ROCCHIO_TOPK,
    alpha_e3: int = ROCCHIO_ALPHA_E3,
    beta_e3: int = ROCCHIO_BETA_E3,
) -> str:
    """rocchio_expand oracle: the full `_bm25_sql` as the feedback
    subquery (the rrf splice precedent — bm25 constants flow in),
    identical tf/df/N chains, the one-expression ln floor, pure
    BIGINT α/β mix."""
    return f"""
WITH lex AS (
  SELECT doc_id FROM ({_bm25_sql()}) WHERE rank <= {r}
), toks AS MATERIALIZED (
  SELECT doc_id,
         regexp_split_to_array(trim(lower(text)), '[ \\t\\n\\x0B\\f\\r]+') AS t
  FROM documents WHERE trim(text) <> ''
), qterms AS (
  SELECT tok FROM (
    SELECT tok, count(*) AS c
    FROM (SELECT unnest(t) AS tok FROM toks) GROUP BY 1
    ORDER BY c DESC, tok LIMIT {BM25_N_TERMS})
), fb_tf AS (
  SELECT tok, CAST(count(*) AS BIGINT) AS sum_tf
  FROM (SELECT unnest(t) AS tok FROM toks JOIN lex USING (doc_id))
  GROUP BY 1
), df_t AS (
  SELECT tok, CAST(count(*) AS BIGINT) AS df
  FROM (SELECT doc_id, unnest(list_distinct(t)) AS tok FROM toks)
  GROUP BY 1
), nn AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs FROM toks
), scored AS (
  SELECT d.tok,
         CAST(CASE WHEN d.tok IN (SELECT tok FROM qterms)
                   THEN 1 ELSE 0 END AS BIGINT) AS is_q,
         f.sum_tf, d.df,
         CAST(floor((CAST(f.sum_tf AS DOUBLE) / {r}.0)
                    * ln(CAST(nn.n_docs AS DOUBLE) / CAST(d.df AS DOUBLE))
                    * 1000.0) AS BIGINT) AS fb_e3
  FROM df_t d JOIN fb_tf f USING (tok) CROSS JOIN nn
)
SELECT tok, is_q, sum_tf, df, fb_e3,
       CAST({alpha_e3} * is_q + ({beta_e3} * fb_e3) // 1000 AS BIGINT)
         AS score_e3
FROM scored
ORDER BY score_e3 DESC, tok LIMIT {topk}
"""


# k-center greedy coreset constants — MIRRORED in `_kcenter_sql`
# (unrolled pick chain); change together.  Seed = min vec_id; the
# seed's cover sentinel is -200000 on BOTH engines (outside the
# [-1e5, 1e5] floored-cosine range).
KCENTER_K = 8
KCENTER_SEED_COVER = -200000


def q_kcenter_coreset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-center greedy coreset selection (farthest-point sampling —
    Sener & Savarese, ICLR 2018): pick the vector FARTHEST from the
    already-picked set, ``KCENTER_K`` times — the coverage-maximizing
    data-selection rule, and the diversity-first complement of the
    redundancy-removers (`semantic_dedup` drops near-pairs, `d4_prune`
    prunes prototypes, `mmr_select` trades relevance off against
    diversity; this one MAXIMIZES the minimum pairwise spread, the 2-OPT
    approximation of the k-center cover).  Emits each pick's rank, its
    cover (max e5-floored cosine to the EARLIER picks — how redundant
    the pick already was; monotone non-decreasing), and how many corpus
    vectors the pick covers under max-cosine assignment.

    Cross-engine: distance = the e5-floored cosine (`_cosine_cols`
    index-order fold ↔ DuckDB list_cosine_similarity ::DOUBLE[], the
    knn_graph discipline); argmin pick rule (msim ASC, vec_id ASC) and
    the assignment argmax (cos_e5 DESC, sel_rank ASC) are mirrored in
    the UNROLLED pick-chain SQL; seed = min vec_id, seed cover = the
    ``KCENTER_SEED_COVER`` sentinel.  All BIGINT past the shared
    cosine pairing.

    Scale shape: the canonical distributed greedy k-center — per pick
    ONE pure-map pass (greatest over ≤K literal-array cosine folds; no
    join, no explode) into a 1-row min-struct agg; K passes total, each
    collect metadata-scale (one id + one vector).  Assignment is the
    same pure map + one bounded K-row agg."""
    from rxtls_spark.operators.similarity import _sql_double

    emb = _emb(spark, sf_dir).select("vec_id", "embedding")

    def lit_vec(v) -> F.Column:
        # one-string literal (the _cents_lit py4j rule)
        return F.expr("array(" + ",".join(_sql_double(x) for x in v) + ")")

    def cos_e5(lit: F.Column) -> F.Column:
        return F.floor(
            _cosine_cols(F.col("embedding"), lit) * F.lit(100000.0)
        ).cast("long")

    # the pick's vector rides along in the min-struct (vec_id is unique,
    # so fields after it never influence the ordering) — one driver job
    # per pick instead of two (r6: halves the K round-trips)
    seed = (
        emb.agg(
            F.min(
                F.struct(
                    F.col("vec_id").alias("vec_id"),
                    F.col("embedding").alias("embedding"),
                )
            ).alias("b")
        ).collect()[0]["b"]
    )
    picks = [(1, int(seed["vec_id"]), KCENTER_SEED_COVER)]
    pick_vecs = [seed["embedding"]]
    for t in range(2, KCENTER_K + 1):
        cosses = [cos_e5(lit_vec(v)) for v in pick_vecs]
        msim = F.greatest(*cosses) if len(cosses) > 1 else cosses[0]
        r = (
            emb.where(~F.col("vec_id").isin([p[1] for p in picks]))
            .agg(
                F.min(
                    F.struct(
                        msim.alias("msim"),
                        F.col("vec_id").alias("vec_id"),
                        F.col("embedding").alias("embedding"),
                    )
                ).alias("b")
            )
            .collect()[0]["b"]
        )
        picks.append((t, int(r["vec_id"]), int(r["msim"])))
        pick_vecs.append(r["embedding"])

    best = F.greatest(
        *[
            F.struct(
                cos_e5(lit_vec(v)).alias("c"), F.lit(-t).alias("nr")
            )
            for (t, _, _), v in zip(picks, pick_vecs)
        ]
    )
    counts = (
        emb.select((-best.getField("nr")).alias("sel_rank"))
        .groupBy("sel_rank")
        .agg(F.count(F.lit(1)).cast("long").alias("n_assigned"))
    )
    meta = spark.createDataFrame(
        picks, "sel_rank int, vec_id long, cover_e5 long"
    )
    return meta.join(counts, "sel_rank", "left").select(
        F.col("sel_rank").cast("long").alias("sel_rank"),
        "vec_id",
        "cover_e5",
        F.coalesce("n_assigned", F.lit(0)).cast("long").alias("n_assigned"),
    )


def _kcenter_sql(k: int = KCENTER_K) -> str:
    """kcenter_coreset oracle: the UNROLLED greedy pick chain — per
    pick a running-max-similarity CTE (greatest of the floored-cosine
    pairing) and an (msim ASC, vec_id ASC) LIMIT-1 pick — then the
    mirrored argmax assignment counts."""

    def cos(a: str, b: str) -> str:
        return (
            f"CAST(floor(list_cosine_similarity({a}::DOUBLE[],"
            f" {b}::DOUBLE[]) * 100000) AS BIGINT)"
        )

    head = f"""WITH emb AS (
  SELECT vec_id, embedding FROM embeddings
), p1 AS (
  SELECT 1 AS sel_rank, vec_id,
         CAST({KCENTER_SEED_COVER} AS BIGINT) AS cover_e5, embedding
  FROM emb ORDER BY vec_id LIMIT 1
)"""
    for t in range(2, k + 1):
        if t == 2:
            head += f""",
m2 AS (
  SELECT e.vec_id, e.embedding,
         {cos('e.embedding', 'p1.embedding')} AS msim
  FROM emb e, p1 WHERE e.vec_id <> p1.vec_id
)"""
        else:
            head += f""",
m{t} AS (
  SELECT m.vec_id, m.embedding,
         greatest(m.msim,
                  {cos('m.embedding', f'p{t - 1}.embedding')}) AS msim
  FROM m{t - 1} m, p{t - 1} WHERE m.vec_id <> p{t - 1}.vec_id
)"""
        head += f""",
p{t} AS (
  SELECT {t} AS sel_rank, vec_id, msim AS cover_e5, embedding
  FROM m{t} ORDER BY msim, vec_id LIMIT 1
)"""
    picks_union = "\n  UNION ALL\n  ".join(
        f"SELECT sel_rank, vec_id, cover_e5, embedding FROM p{t}"
        for t in range(1, k + 1)
    )
    return head + f""",
picks AS (
  {picks_union}
), asg AS (
  SELECT e.vec_id, p.sel_rank,
         row_number() OVER (
           PARTITION BY e.vec_id
           ORDER BY {cos('e.embedding', 'p.embedding')} DESC,
                    p.sel_rank) AS rn
  FROM emb e, picks p
), counts AS (
  SELECT sel_rank, CAST(count(*) AS BIGINT) AS n_assigned
  FROM asg WHERE rn = 1 GROUP BY 1
)
SELECT CAST(p.sel_rank AS BIGINT) AS sel_rank, p.vec_id, p.cover_e5,
       CAST(coalesce(c.n_assigned, 0) AS BIGINT) AS n_assigned
FROM picks p LEFT JOIN counts c USING (sel_rank)
"""


def q_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-means as a first-class operator — and the TRAINING LOOP
    itself is value-hash-checked: deterministic Lloyd's (Knuth-hash
    seeding, L2 assignment with lowest-cell tie-break, per-iteration
    means rounded to 6 dp) is mirrored by an UNROLLED 3-iteration SQL
    oracle, so a drift anywhere in seeding, assignment, or the update
    step flips the hash.  Cross-engine exactness: both engines sum the
    squared-difference terms sequentially in index order (Spark
    zip_with+aggregate fold vs DuckDB list_distance), so assignment
    compares identical doubles; the 6-dp round absorbs float-sum-order
    noise in the means.  Scale shape (same as train_ivf_centroids):
    per-row JVM argmax against a literal centroid array — no explode,
    no join — plus one k-row hash agg per iteration.  Emits the final
    centroid matrix as (cell, i, m) rows with per-cell assignment
    counts."""
    from rxtls_spark.operators.similarity import (
        _emb_dim,
        ivf_assign_expr,
        train_ivf_centroids,
    )

    emb = _emb(spark, sf_dir)
    dim = _emb_dim(emb)
    if dim != KMEANS_DIM:  # oracle SQL is unrolled for this dim
        raise ValueError(
            f"embeddings dim {dim} != KMEANS_DIM {KMEANS_DIM}; "
            "regenerate _kmeans_sql with the new dim"
        )
    seed = knuth_hash(F.col("vec_id"))
    cents = train_ivf_centroids(
        emb,
        k=KMEANS_K,
        iters=KMEANS_ITERS,
        metric="l2",
        seed_order=seed,
        round_dp=6,
    )
    cell = ivf_assign_expr(cents, F.col("embedding"), metric="l2")
    counts = (
        emb.select(cell.alias("cell"))
        .groupBy("cell")
        .agg(F.count(F.lit(1)).cast("long").alias("n_vecs"))
    )
    cent_rows = spark.createDataFrame(
        [(c, i, float(v)) for c, vec in cents for i, v in enumerate(vec)],
        "cell int, i int, m double",
    )
    return (
        cent_rows.join(counts, "cell", "left")
        .select(
            F.col("cell").cast("long").alias("cell"),
            F.col("i").cast("long").alias("i"),
            "m",
            F.coalesce("n_vecs", F.lit(0)).cast("long").alias("n_vecs"),
        )
    )


def q_cluster_purity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """External clustering evaluation — per-cell label purity of the
    `kmeans` quantizer against the embeddings table's ground-truth
    `label` column (the standard purity metric: majority-label
    fraction per cluster).  Completes the evaluation-harness family
    (`ann_recall_eval` for index quality, `lm_eval_holdout` for LM
    quality, this for clustering quality).  Majority = max count with
    a smallest-label tie-break; purity_e5 = (n_top*1e5) DIV n_vecs is
    exact BIGINT, so beyond the shared (proven) kmeans training spec
    the query is exact-by-construction cross-engine.

    Scale shape: training is metadata-scale (the shared
    train_ivf_centroids), assignment a per-row JVM argmin map, then
    TWO bounded hash aggs — (cell,label) counts (≤ k·|labels| rows)
    and the per-cell majority via ONE struct-max agg (no window, no
    second shuffle of data rows)."""
    from rxtls_spark.operators.similarity import (
        ivf_assign_expr,
        train_ivf_centroids,
    )

    emb = _emb(spark, sf_dir)
    cents = train_ivf_centroids(
        emb,
        k=KMEANS_K,
        iters=KMEANS_ITERS,
        metric="l2",
        seed_order=knuth_hash(F.col("vec_id")),
        round_dp=6,
    )
    asg = emb.select(
        ivf_assign_expr(cents, F.col("embedding"), metric="l2").alias(
            "cell"
        ),
        F.col("label").cast("long").alias("label"),
    )
    bycl = asg.groupBy("cell", "label").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    per_cell = bycl.groupBy("cell").agg(
        F.sum("cnt").cast("long").alias("n_vecs"),
        F.max(
            F.struct(
                F.col("cnt").alias("cnt"),
                (-F.col("label")).alias("neg_label"),
            )
        ).alias("best"),
    )
    return per_cell.select(
        F.col("cell").cast("long").alias("cell"),
        "n_vecs",
        (-F.col("best.neg_label")).cast("long").alias("top_label"),
        F.col("best.cnt").cast("long").alias("n_top"),
        F.expr("CAST((best.cnt * 100000) DIV n_vecs AS BIGINT)").alias(
            "purity_e5"
        ),
    )


def q_silhouette(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERNAL clustering evaluation — per-cell simplified silhouette
    (Vendramin et al. 2010; the centroid-based variant Hamerly-style
    pipelines use because the exact silhouette's all-pairs distances
    don't exist at scale): per vector a = L2 distance to its OWN
    final centroid, b = the min distance to any OTHER centroid,
    s = (b - a)/max(a, b) in [-1, 1].  The internal twin of
    `cluster_purity` (external, needs labels): purity asks "do
    clusters match ground truth?", silhouette asks "are clusters
    tight and separated?" with no labels needed — the k-picker's
    metric.

    Cross-engine: the quantizer is the shared proven kmeans spec
    (train_ivf_centroids == `_kmeans_cents_ctes` — kmeans constants
    flow in); assignment is the identical (distance, cell) argmin;
    per-row s ships as the e5 floor (engines' sqrt/fold agree to ulp,
    the cos_e5 acceptance), per-cell sums are exact BIGINTs and the
    mean is sum DIV n (signed truncation agrees).

    Scale shape: training is metadata-scale; a/b/s is a pure per-row
    map against the k-row literal centroid array (no explode, no
    join); the audit is ONE ≤k-row hash agg."""
    from rxtls_spark.operators.similarity import (
        _cents_lit,
        _l2sq_cols,
        ivf_assign_expr,
        train_ivf_centroids,
    )

    emb = _emb(spark, sf_dir)
    cents = train_ivf_centroids(
        emb,
        k=KMEANS_K,
        iters=KMEANS_ITERS,
        metric="l2",
        seed_order=knuth_hash(F.col("vec_id")),
        round_dp=6,
    )
    darr = F.transform(
        _cents_lit(cents),
        lambda c: F.sqrt(_l2sq_cols(F.col("embedding"), c["centroid"])),
    )
    base = emb.select(
        ivf_assign_expr(cents, F.col("embedding"), metric="l2").alias(
            "cell"
        ),
        darr.alias("d"),
    ).select(
        "cell",
        F.expr("get(d, CAST(cell AS INT))").alias("a"),
        F.array_min(
            F.filter(
                F.transform(
                    "d",
                    lambda x, i: F.when(
                        i != F.col("cell").cast("int"), x
                    ),
                ),
                lambda x: x.isNotNull(),
            )
        ).alias("b"),
    )
    s_e5 = F.when(
        F.greatest("a", "b") > 0,
        F.floor((F.col("b") - F.col("a")) / F.greatest("a", "b") * 100000),
    ).otherwise(F.lit(0)).cast("long")
    return (
        base.select(F.col("cell").cast("long").alias("cell"), s_e5.alias("s_e5"))
        .groupBy("cell")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_vecs"),
            F.sum("s_e5").cast("long").alias("sum_s_e5"),
            F.expr("CAST(sum(s_e5) DIV count(1) AS BIGINT)").alias(
                "mean_s_e5"
            ),
        )
    )


def _silhouette_sql(
    k: int = KMEANS_K, iters: int = KMEANS_ITERS, dim: int = KMEANS_DIM
) -> str:
    """Silhouette oracle: the shared unrolled-Lloyd's centroid CTEs,
    the identical (list_distance, cell) argmin, own/other distances
    from the same k×n distance relation, the e5-floored simplified
    silhouette, and pure-BIGINT per-cell sums."""
    ctes = _kmeans_cents_ctes(k, iters, dim)
    return (
        "WITH "
        + ",\n".join(ctes)
        + f""",
d AS (
  SELECT e.vec_id, c.cell, list_distance(e.emb, c.centroid) AS dist
  FROM e, cents{iters} c
), asg AS (
  SELECT vec_id, cell AS own_cell, dist AS a FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id
                                 ORDER BY dist, cell) AS rn
    FROM d)
  WHERE rn = 1
), bmin AS (
  SELECT d.vec_id, min(d.dist) AS b
  FROM d JOIN asg USING (vec_id)
  WHERE d.cell <> asg.own_cell GROUP BY 1
), s AS (
  SELECT a.vec_id, a.own_cell AS cell,
         CASE WHEN greatest(a.a, b.b) > 0
              THEN CAST(floor((b.b - a.a) / greatest(a.a, b.b) * 100000)
                        AS BIGINT)
              ELSE 0 END AS s_e5
  FROM asg a JOIN bmin b USING (vec_id)
)
SELECT CAST(cell AS BIGINT) AS cell,
       CAST(count(*) AS BIGINT) AS n_vecs,
       CAST(sum(s_e5) AS BIGINT) AS sum_s_e5,
       CAST(sum(s_e5) // count(*) AS BIGINT) AS mean_s_e5
FROM s GROUP BY 1
"""
    )


def _kmeans_cents_ctes(
    k: int = KMEANS_K, iters: int = KMEANS_ITERS, dim: int = KMEANS_DIM
) -> list[str]:
    """The unrolled-Lloyd's CTE chain (e, cents0 .. cents{iters}) shared
    verbatim by the `kmeans` and `semantic_dedup` oracles — both mirror
    `train_ivf_centroids(metric='l2', seed_order=knuth, round_dp=6)`."""
    ctes = [
        f"""e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
  FROM embeddings
), cents0 AS (
  SELECT cell, emb AS centroid FROM (
    SELECT emb, CAST(row_number() OVER (
      ORDER BY ((vec_id % 1000000007) * 2654435761) % 1000000007, vec_id) - 1 AS INTEGER
    ) AS cell
    FROM e
  ) WHERE cell < {k}
)"""
    ]
    for it in range(1, iters + 1):
        ctes.append(
            f"""asg{it} AS (
  SELECT vec_id, emb, cell FROM (
    SELECT e.vec_id, e.emb, c.cell,
      row_number() OVER (PARTITION BY e.vec_id
                         ORDER BY list_distance(e.emb, c.centroid), c.cell
      ) AS rn
    FROM e, cents{it - 1} c)
  WHERE rn = 1
), newc{it} AS (
  SELECT cell, list(m ORDER BY i) AS centroid FROM (
    SELECT cell, i, floor(avg(emb[i]) * 1000000 + 0.5) / 1000000 AS m
    FROM asg{it}, generate_series(1, {dim}) t(i)
    GROUP BY cell, i
  ) GROUP BY cell
), cents{it} AS (
  SELECT c.cell, coalesce(n.centroid, c.centroid) AS centroid
  FROM cents{it - 1} c LEFT JOIN newc{it} n USING (cell)
)"""
        )
    return ctes


def _kmeans_sql(k: int = KMEANS_K, iters: int = KMEANS_ITERS, dim: int = KMEANS_DIM) -> str:
    """Unrolled Lloyd's in DuckDB SQL mirroring q_kmeans exactly:
    same Knuth-hash seeds, same L2 argmin with (distance, cell)
    tie-break, same 6-dp rounded means, empty cells keep their
    previous centroid."""
    ctes = _kmeans_cents_ctes(k, iters, dim)
    ctes.append(
        f"""counts AS (
  SELECT cell, CAST(count(*) AS BIGINT) AS n_vecs FROM (
    SELECT vec_id, cell FROM (
      SELECT e.vec_id, c.cell,
        row_number() OVER (PARTITION BY e.vec_id
                           ORDER BY list_distance(e.emb, c.centroid), c.cell
        ) AS rn
      FROM e, cents{iters} c)
    WHERE rn = 1
  ) GROUP BY cell
)"""
    )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT CAST(c.cell AS BIGINT) AS cell, CAST(t.i - 1 AS BIGINT) AS i,
       c.centroid[t.i] AS m, coalesce(n.n_vecs, 0) AS n_vecs
FROM cents{iters} c
LEFT JOIN counts n USING (cell), generate_series(1, {dim}) t(i)
"""
    )


def _cluster_purity_sql(
    k: int = KMEANS_K, iters: int = KMEANS_ITERS, dim: int = KMEANS_DIM
) -> str:
    """Purity oracle: the shared unrolled-Lloyd's centroid CTEs, the
    identical (list_distance, cell) argmin assignment, labels joined
    back by vec_id, then pure-BIGINT counts with the (cnt DESC, label)
    majority rule and the (n_top*1e5) DIV n_vecs purity — exact, no
    rounding anywhere past the shared kmeans spec."""
    ctes = _kmeans_cents_ctes(k, iters, dim)
    return (
        "WITH "
        + ",\n".join(ctes)
        + f""",
asg AS (
  SELECT vec_id, cell FROM (
    SELECT e.vec_id, c.cell,
      row_number() OVER (PARTITION BY e.vec_id
                         ORDER BY list_distance(e.emb, c.centroid), c.cell
      ) AS rn
    FROM e, cents{iters} c)
  WHERE rn = 1
), cnts AS (
  SELECT a.cell, CAST(b.label AS BIGINT) AS label,
         CAST(count(*) AS BIGINT) AS cnt
  FROM asg a JOIN embeddings b ON a.vec_id = b.vec_id
  GROUP BY 1, 2
), tot AS (
  SELECT cell, CAST(sum(cnt) AS BIGINT) AS n_vecs FROM cnts GROUP BY 1
), best AS (
  SELECT cell, label AS top_label, cnt AS n_top FROM (
    SELECT *, row_number() OVER (PARTITION BY cell
                                 ORDER BY cnt DESC, label) AS rn
    FROM cnts)
  WHERE rn = 1
)
SELECT CAST(t.cell AS BIGINT) AS cell, t.n_vecs, b.top_label, b.n_top,
       CAST((b.n_top * 100000) // t.n_vecs AS BIGINT) AS purity_e5
FROM tot t JOIN best b USING (cell)
"""
    )


# kNN-graph neighbor count — MIRRORED in `_knn_graph_sql`; change
# together.  Candidates come from the kmeans cells, so the kmeans spec
# constants flow into this query too.
KNN_K = 5


def q_knn_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual k-nearest-neighbor graph construction over the embedding
    space — the shared substrate of SemDeDup-style clustering,
    graph-based dedup, and kNN-classifier data auditing: for every
    vector, its top-``KNN_K`` in-cell neighbors by cosine, with a
    `mutual` flag marking edges whose reverse edge also made the
    other endpoint's top-k (mutual-kNN edges are the high-precision
    ones real pipelines keep).

    Candidates come from the SAME deterministic kmeans quantizer as
    `semantic_dedup` / `cluster_purity` (cell equi-join — the
    production shape: never an all-pairs corpus join; k grows with
    the corpus per the SemDeDup sizing argument).  Ranking is the
    e5-floored cosine with the (cos_e5 DESC, nbr) tie-break, so both
    engines pick identical edges; the mutual flag is a left self-join
    on the reversed edge — every output column BIGINT.

    Scale shape: training metadata-scale; assignment a pure map; ONE
    cell equi-join for candidates; the per-src top-k plans as
    WindowGroupLimit (rank<=k pushed map-side, no full per-cell
    sort); the mutual join is kNN-output-sized (N*k rows)."""
    from pyspark.sql.window import Window

    from rxtls_spark.operators.similarity import (
        cosine_expr,
        ivf_assign_expr,
        train_ivf_centroids,
    )

    emb = _emb(spark, sf_dir)
    cents = train_ivf_centroids(
        emb,
        k=KMEANS_K,
        iters=KMEANS_ITERS,
        metric="l2",
        seed_order=knuth_hash(F.col("vec_id")),
        round_dp=6,
    )
    asg = emb.select(
        "vec_id",
        "embedding",
        ivf_assign_expr(cents, F.col("embedding"), metric="l2").alias(
            "cell"
        ),
    ).localCheckpoint(eager=False)  # assign once for both join sides
    a = asg.select(
        F.col("vec_id").alias("src"),
        F.col("embedding").alias("emb_a"),
        "cell",
    )
    b = asg.select(
        F.col("vec_id").alias("nbr"),
        F.col("embedding").alias("emb_b"),
        "cell",
    )
    pairs = (
        a.join(b, "cell")
        .where(F.col("src") != F.col("nbr"))
        .select(
            "src",
            "nbr",
            F.floor(cosine_expr("emb_a", "emb_b") * 100000)
            .cast("long")
            .alias("cos_e5"),
        )
    )
    w = Window.partitionBy("src").orderBy(F.col("cos_e5").desc(), "nbr")
    knn = pairs.withColumn("rn", F.row_number().over(w)).where(
        F.col("rn") <= KNN_K
    )
    rev = knn.select(
        F.col("nbr").alias("r_src"), F.col("src").alias("r_nbr")
    )
    return knn.join(
        rev,
        (knn["src"] == rev["r_src"]) & (knn["nbr"] == rev["r_nbr"]),
        "left",
    ).select(
        F.col("src").alias("vec_id"),
        F.col("rn").cast("long").alias("rank"),
        F.col("nbr").alias("nbr_id"),
        "cos_e5",
        F.when(F.col("r_src").isNotNull(), F.lit(1))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("mutual"),
    )


def _knn_graph_sql(
    k: int = KMEANS_K,
    iters: int = KMEANS_ITERS,
    dim: int = KMEANS_DIM,
    knn_k: int = KNN_K,
) -> str:
    """kNN-graph oracle: the shared unrolled-Lloyd's centroid CTEs,
    the identical argmin assignment, in-cell pairs with e5-floored
    cosine, the (cos_e5 DESC, nbr) window top-k, and the reversed-edge
    left join for the mutual flag — all BIGINT."""
    ctes = _kmeans_cents_ctes(k, iters, dim)
    return (
        "WITH "
        + ",\n".join(ctes)
        + f""",
asg AS (
  SELECT vec_id, emb, cell FROM (
    SELECT e.vec_id, e.emb, c.cell,
      row_number() OVER (PARTITION BY e.vec_id
                         ORDER BY list_distance(e.emb, c.centroid), c.cell
      ) AS rn
    FROM e, cents{iters} c)
  WHERE rn = 1
), p AS (
  SELECT a.vec_id AS src, b.vec_id AS nbr,
         CAST(floor(list_cosine_similarity(a.emb, b.emb) * 100000)
              AS BIGINT) AS cos_e5
  FROM asg a JOIN asg b ON a.cell = b.cell AND a.vec_id <> b.vec_id
), knn AS (
  SELECT src, nbr, cos_e5, rn FROM (
    SELECT *, row_number() OVER (
      PARTITION BY src ORDER BY cos_e5 DESC, nbr) AS rn
    FROM p)
  WHERE rn <= {knn_k}
)
SELECT k.src AS vec_id, CAST(k.rn AS BIGINT) AS rank, k.nbr AS nbr_id,
       k.cos_e5,
       CAST(CASE WHEN m.src IS NOT NULL THEN 1 ELSE 0 END AS BIGINT)
         AS mutual
FROM knn k LEFT JOIN knn m ON k.src = m.nbr AND k.nbr = m.src
"""
    )


def _hard_negatives_sql(
    k: int = KMEANS_K, iters: int = KMEANS_ITERS, dim: int = KMEANS_DIM
) -> str:
    """hard_negatives oracle: the shared unrolled-Lloyd's centroid
    CTEs (another `_kmeans_cents_ctes` consumer — kmeans constants
    flow in), identical assignment, in-cell pairs with e5-floored
    cosine, the per-(anchor, is_pos) top-1 window and the inner
    pos×neg join."""
    ctes = _kmeans_cents_ctes(k, iters, dim)
    return (
        "WITH "
        + ",\n".join(ctes)
        + f""",
lab AS (
  SELECT vec_id, CAST(label AS BIGINT) AS label FROM embeddings
), asg AS (
  SELECT a.vec_id, a.emb, a.cell, l.label FROM (
    SELECT vec_id, emb, cell FROM (
      SELECT e.vec_id, e.emb, c.cell,
        row_number() OVER (PARTITION BY e.vec_id
                           ORDER BY list_distance(e.emb, c.centroid), c.cell
        ) AS rn
      FROM e, cents{iters} c)
    WHERE rn = 1
  ) a JOIN lab l USING (vec_id)
), p AS (
  SELECT a.vec_id AS anchor, a.label AS lab_a, b.vec_id AS cand,
         CASE WHEN a.label = b.label THEN 1 ELSE 0 END AS is_pos,
         CAST(floor(list_cosine_similarity(a.emb, b.emb) * 100000)
              AS BIGINT) AS cos_e5
  FROM asg a JOIN asg b ON a.cell = b.cell AND a.vec_id <> b.vec_id
), top1 AS (
  SELECT anchor, lab_a, cand, is_pos, cos_e5 FROM (
    SELECT *, row_number() OVER (
      PARTITION BY anchor, is_pos ORDER BY cos_e5 DESC, cand) AS rn
    FROM p)
  WHERE rn = 1
)
SELECT pos.anchor, pos.lab_a AS label,
       pos.cand AS pos_id, pos.cos_e5 AS pos_cos_e5,
       neg.cand AS neg_id, neg.cos_e5 AS neg_cos_e5,
       CAST(pos.cos_e5 - neg.cos_e5 AS BIGINT) AS margin_e5
FROM top1 pos JOIN top1 neg
  ON pos.anchor = neg.anchor AND pos.is_pos = 1 AND neg.is_pos = 0
"""
    )


def _knn_components_sql(
    k: int = KMEANS_K,
    iters: int = KMEANS_ITERS,
    dim: int = KMEANS_DIM,
    knn_k: int = KNN_K,
) -> str:
    """knn_components oracle: the knn_graph SQL chain (kmeans
    centroids → in-cell pairs → top-k → mutual flag) feeding the
    dedup_clusters WITH RECURSIVE min-label closure over the mutual
    undirected edge set."""
    ctes = _kmeans_cents_ctes(k, iters, dim)
    return (
        "WITH RECURSIVE "
        + ",\n".join(ctes)
        + f""",
asg AS (
  SELECT vec_id, emb, cell FROM (
    SELECT e.vec_id, e.emb, c.cell,
      row_number() OVER (PARTITION BY e.vec_id
                         ORDER BY list_distance(e.emb, c.centroid), c.cell
      ) AS rn
    FROM e, cents{iters} c)
  WHERE rn = 1
), p AS (
  SELECT a.vec_id AS src, b.vec_id AS nbr,
         CAST(floor(list_cosine_similarity(a.emb, b.emb) * 100000)
              AS BIGINT) AS cos_e5
  FROM asg a JOIN asg b ON a.cell = b.cell AND a.vec_id <> b.vec_id
), knn AS (
  SELECT src, nbr FROM (
    SELECT *, row_number() OVER (
      PARTITION BY src ORDER BY cos_e5 DESC, nbr) AS rn
    FROM p)
  WHERE rn <= {knn_k}
), mutual AS (
  SELECT k.src AS a, k.nbr AS b
  FROM knn k JOIN knn m ON k.src = m.nbr AND k.nbr = m.src
), edges AS (
  SELECT a, b FROM mutual UNION SELECT b, a FROM mutual
), nodes AS (
  SELECT DISTINCT a AS vec_id FROM edges
), reach(vec_id, label) AS (
  SELECT vec_id, vec_id FROM nodes
  UNION
  SELECT e.a, r.label FROM edges e JOIN reach r ON e.b = r.vec_id
), cc AS (
  SELECT vec_id, min(label) AS cluster_root FROM reach GROUP BY 1
), sized AS (
  SELECT cluster_root, CAST(count(*) AS BIGINT) AS comp_size
  FROM cc GROUP BY 1
)
SELECT cc.vec_id, cc.cluster_root, s.comp_size
FROM cc JOIN sized s USING (cluster_root)
"""
    )


def _ann_recall_sql(
    k: int = KMEANS_K,
    iters: int = KMEANS_ITERS,
    dim: int = KMEANS_DIM,
    topk: int = ANN_EVAL_K,
    n_probe: int = ANN_EVAL_NPROBE,
) -> str:
    """Recall@k oracle: the shared unrolled-Lloyd's centroid CTEs, the
    identical (list_distance, cell) assignment/probe ordering (sqrt is
    monotone, so it matches Spark's squared-L2 argmin), e5-floored
    cosine ranking with neighbor_id tie-break on BOTH the probed and
    the exact side, then the per-query intersection count."""
    ctes = _kmeans_cents_ctes(k, iters, dim)
    return (
        "WITH "
        + ",\n".join(ctes)
        + f""",
asg AS (
  SELECT vec_id, emb, cell FROM (
    SELECT e.vec_id, e.emb, c.cell,
      row_number() OVER (PARTITION BY e.vec_id
                         ORDER BY list_distance(e.emb, c.centroid), c.cell
      ) AS rn
    FROM e, cents{iters} c)
  WHERE rn = 1
), q AS (
  SELECT vec_id AS q_id, emb AS q_emb FROM e WHERE vec_id % 100 = 0
), probe AS (
  SELECT q_id, q_emb, cell FROM (
    SELECT q.q_id, q.q_emb, c.cell,
      row_number() OVER (PARTITION BY q.q_id
                         ORDER BY list_distance(q.q_emb, c.centroid), c.cell
      ) AS rn
    FROM q, cents{iters} c)
  WHERE rn <= {n_probe}
), approx AS (
  SELECT q_id, neighbor_id FROM (
    SELECT q_id, neighbor_id,
      row_number() OVER (PARTITION BY q_id
                         ORDER BY sim_e5 DESC, neighbor_id) AS rn
    FROM (
      SELECT p.q_id, a.vec_id AS neighbor_id,
        CAST(floor(list_cosine_similarity(a.emb, p.q_emb) * 100000)
             AS BIGINT) AS sim_e5
      FROM probe p JOIN asg a ON p.cell = a.cell
      WHERE a.vec_id <> p.q_id))
  WHERE rn <= {topk}
), exact AS (
  SELECT q_id, neighbor_id FROM (
    SELECT q.q_id, e.vec_id AS neighbor_id,
      row_number() OVER (PARTITION BY q.q_id
        ORDER BY CAST(floor(list_cosine_similarity(e.emb, q.q_emb) * 100000)
                      AS BIGINT) DESC, e.vec_id) AS rn
    FROM e, q WHERE e.vec_id <> q.q_id)
  WHERE rn <= {topk}
), hit AS (
  SELECT a.q_id, count(*) AS n_hit
  FROM approx a JOIN exact x ON a.q_id = x.q_id AND a.neighbor_id = x.neighbor_id
  GROUP BY 1
)
SELECT q.q_id, CAST(coalesce(h.n_hit, 0) AS BIGINT) AS n_hit,
       CAST(coalesce(h.n_hit, 0) AS DOUBLE) / {float(topk)} AS recall
FROM q LEFT JOIN hit h ON q.q_id = h.q_id
"""
    )


def _ndcg_sql(
    k: int = KMEANS_K,
    iters: int = KMEANS_ITERS,
    dim: int = KMEANS_DIM,
    topk: int = ANN_EVAL_K,
    n_probe: int = ANN_EVAL_NPROBE,
) -> str:
    """NDCG@k oracle: the recall-eval CTEs carrying (rn, sim_e5) on
    both the probed and exact lists, then Σ greatest(sim_e5,0)·w[rn]
    with the SAME integer `_ndcg_weights` literals (1-based DuckDB
    list indexing) and the BIGINT (dcg·1e6) DIV idcg ratio."""
    ctes = _kmeans_cents_ctes(k, iters, dim)
    wlist = "[" + ", ".join(str(x) for x in _ndcg_weights(topk)) + "]"
    return (
        "WITH "
        + ",\n".join(ctes)
        + f""",
asg AS (
  SELECT vec_id, emb, cell FROM (
    SELECT e.vec_id, e.emb, c.cell,
      row_number() OVER (PARTITION BY e.vec_id
                         ORDER BY list_distance(e.emb, c.centroid), c.cell
      ) AS rn
    FROM e, cents{iters} c)
  WHERE rn = 1
), q AS (
  SELECT vec_id AS q_id, emb AS q_emb FROM e WHERE vec_id % 100 = 0
), probe AS (
  SELECT q_id, q_emb, cell FROM (
    SELECT q.q_id, q.q_emb, c.cell,
      row_number() OVER (PARTITION BY q.q_id
                         ORDER BY list_distance(q.q_emb, c.centroid), c.cell
      ) AS rn
    FROM q, cents{iters} c)
  WHERE rn <= {n_probe}
), approx AS (
  SELECT q_id, sim_e5, rn FROM (
    SELECT q_id, neighbor_id, sim_e5,
      row_number() OVER (PARTITION BY q_id
                         ORDER BY sim_e5 DESC, neighbor_id) AS rn
    FROM (
      SELECT p.q_id, a.vec_id AS neighbor_id,
        CAST(floor(list_cosine_similarity(a.emb, p.q_emb) * 100000)
             AS BIGINT) AS sim_e5
      FROM probe p JOIN asg a ON p.cell = a.cell
      WHERE a.vec_id <> p.q_id))
  WHERE rn <= {topk}
), exact AS (
  SELECT q_id, sim_e5, rn FROM (
    SELECT q.q_id, e.vec_id AS neighbor_id,
      CAST(floor(list_cosine_similarity(e.emb, q.q_emb) * 100000)
           AS BIGINT) AS sim_e5,
      row_number() OVER (PARTITION BY q.q_id
        ORDER BY CAST(floor(list_cosine_similarity(e.emb, q.q_emb) * 100000)
                      AS BIGINT) DESC, e.vec_id) AS rn
    FROM e, q WHERE e.vec_id <> q.q_id)
  WHERE rn <= {topk}
), dcg AS (
  SELECT q_id,
         CAST(sum(greatest(sim_e5, 0) * ({wlist}[rn])) AS BIGINT)
           AS dcg_num
  FROM approx GROUP BY 1
), idcg AS (
  SELECT q_id,
         CAST(sum(greatest(sim_e5, 0) * ({wlist}[rn])) AS BIGINT)
           AS idcg_num
  FROM exact GROUP BY 1
)
SELECT q.q_id,
  CAST(coalesce(d.dcg_num, 0) AS BIGINT) AS dcg_num,
  CAST(coalesce(i.idcg_num, 0) AS BIGINT) AS idcg_num,
  CAST(CASE WHEN coalesce(i.idcg_num, 0) > 0
       THEN (coalesce(d.dcg_num, 0) * 1000000) // i.idcg_num
       ELSE 0 END AS BIGINT) AS ndcg_e6
FROM q
LEFT JOIN dcg d ON q.q_id = d.q_id
LEFT JOIN idcg i ON q.q_id = i.q_id
"""
    )


def _semantic_dedup_sql(
    k: int = KMEANS_K, iters: int = KMEANS_ITERS, dim: int = KMEANS_DIM
) -> str:
    """SemDeDup oracle: the SAME unrolled-Lloyd's centroid CTEs as the
    `kmeans` oracle (trained on the BASE embeddings table), then the
    base+injected-copy union assigned to cells by the identical
    (list_distance, cell) argmin, within-cell pairs above τ, and the
    per-victim (min-keeper, arg_min sim) aggregation mirroring the
    Spark groupBy exactly."""
    ctes = _kmeans_cents_ctes(k, iters, dim)
    return (
        "WITH "
        + ",\n".join(ctes)
        + f""",
uni AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
  FROM embeddings
  UNION ALL
  SELECT vec_id + 1000000, list_transform(embedding, x -> CAST(x AS DOUBLE))
  FROM embeddings WHERE vec_id % 25 = 0
), asg AS (
  SELECT vec_id, emb, cell FROM (
    SELECT u.vec_id, u.emb, c.cell,
      row_number() OVER (PARTITION BY u.vec_id
                         ORDER BY list_distance(u.emb, c.centroid), c.cell
      ) AS rn
    FROM uni u, cents{iters} c)
  WHERE rn = 1
), pairs AS (
  SELECT b.vec_id AS vec_id, a.cell AS cell, a.vec_id AS keeper,
    CAST(floor(list_cosine_similarity(a.emb, b.emb) * 100000) AS BIGINT)
      AS sim_e5
  FROM asg a JOIN asg b ON a.cell = b.cell AND a.vec_id < b.vec_id
  WHERE list_cosine_similarity(a.emb, b.emb) >= {SEMDEDUP_TAU}
)
SELECT vec_id, CAST(min(cell) AS BIGINT) AS cell, min(keeper) AS keeper,
       arg_min(sim_e5, keeper) AS sim_e5
FROM pairs GROUP BY vec_id
"""
    )


def _proto_prune_sql(
    k: int = KMEANS_K, iters: int = KMEANS_ITERS, dim: int = KMEANS_DIM
) -> str:
    """SSL-prototypes oracle: the SAME unrolled-Lloyd's centroid CTEs
    as the `kmeans` oracle, the identical (list_distance, cell) argmin
    assignment, cosine-to-own-centroid via list_cosine_similarity
    (matches the Spark zip_with fold to ~1e-10; compared e5-floored),
    and the per-cell rank/threshold in pure BIGINT arithmetic."""
    ctes = _kmeans_cents_ctes(k, iters, dim)
    return (
        "WITH "
        + ",\n".join(ctes)
        + f""",
asg AS (
  SELECT vec_id, emb, cell FROM (
    SELECT e.vec_id, e.emb, c.cell,
      row_number() OVER (PARTITION BY e.vec_id
                         ORDER BY list_distance(e.emb, c.centroid), c.cell
      ) AS rn
    FROM e, cents{iters} c)
  WHERE rn = 1
), scored AS (
  SELECT a.vec_id, CAST(a.cell AS BIGINT) AS cell,
    CAST(floor(list_cosine_similarity(a.emb, c.centroid) * 100000)
         AS BIGINT) AS proto_e5
  FROM asg a JOIN cents{iters} c USING (cell)
), ranked AS (
  SELECT *,
    CAST(row_number() OVER (PARTITION BY cell
                            ORDER BY proto_e5 DESC, vec_id) AS BIGINT) AS rnk,
    CAST(count(*) OVER (PARTITION BY cell) AS BIGINT) AS n_cell
  FROM scored
)
SELECT vec_id, cell, proto_e5, rnk,
       CAST(CASE WHEN rnk > (n_cell * {PROTO_PRUNE_NUM}) // {PROTO_PRUNE_DEN}
                 THEN 1 ELSE 0 END AS BIGINT) AS kept
FROM ranked
"""
    )


def _d4_prune_sql(
    k: int = KMEANS_K, iters: int = KMEANS_ITERS, dim: int = KMEANS_DIM
) -> str:
    """D4 oracle: the shared unrolled-Lloyd's centroid CTEs, the
    `semantic_dedup` union+assignment+pair CTEs gated on the e5-floored
    cosine (both engines compare the identical BIGINT), an anti-join to
    the stage-1 drops, then the `proto_prune` scoring/rank CTEs over
    the SURVIVORS with the same frozen centroids."""
    ctes = _kmeans_cents_ctes(k, iters, dim)
    return (
        "WITH "
        + ",\n".join(ctes)
        + f""",
uni AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
  FROM embeddings
  UNION ALL
  SELECT vec_id + 1000000, list_transform(embedding, x -> CAST(x AS DOUBLE))
  FROM embeddings WHERE vec_id % 25 = 0
), asg AS (
  SELECT vec_id, emb, cell FROM (
    SELECT u.vec_id, u.emb, c.cell,
      row_number() OVER (PARTITION BY u.vec_id
                         ORDER BY list_distance(u.emb, c.centroid), c.cell
      ) AS rn
    FROM uni u, cents{iters} c)
  WHERE rn = 1
), dropped AS (
  SELECT DISTINCT b.vec_id
  FROM asg a JOIN asg b ON a.cell = b.cell AND a.vec_id < b.vec_id
  WHERE CAST(floor(list_cosine_similarity(a.emb, b.emb) * 100000) AS BIGINT)
        >= {SEMDEDUP_TAU_E5}
), surv AS (
  SELECT a.* FROM asg a ANTI JOIN dropped d ON a.vec_id = d.vec_id
), scored AS (
  SELECT s.vec_id, CAST(s.cell AS BIGINT) AS cell,
    CAST(floor(list_cosine_similarity(s.emb, c.centroid) * 100000)
         AS BIGINT) AS proto_e5
  FROM surv s JOIN cents{iters} c USING (cell)
), ranked AS (
  SELECT *,
    CAST(row_number() OVER (PARTITION BY cell
                            ORDER BY proto_e5 DESC, vec_id) AS BIGINT) AS rnk,
    CAST(count(*) OVER (PARTITION BY cell) AS BIGINT) AS n_cell
  FROM scored
)
SELECT a.vec_id, CAST(a.cell AS BIGINT) AS cell, 'semdedup' AS verdict,
       CAST(NULL AS BIGINT) AS proto_e5, CAST(NULL AS BIGINT) AS rnk,
       CAST(0 AS BIGINT) AS kept
FROM asg a JOIN dropped d ON a.vec_id = d.vec_id
UNION ALL
SELECT vec_id, cell,
       CASE WHEN rnk <= (n_cell * {PROTO_PRUNE_NUM}) // {PROTO_PRUNE_DEN}
            THEN 'proto' ELSE 'kept' END AS verdict,
       proto_e5, rnk,
       CAST(CASE WHEN rnk > (n_cell * {PROTO_PRUNE_NUM}) // {PROTO_PRUNE_DEN}
                 THEN 1 ELSE 0 END AS BIGINT) AS kept
FROM ranked
"""
    )


def _mmr_select_sql(
    k: int = MMR_K, lam_num: int = MMR_LAM_NUM, lam_den: int = MMR_LAM_DEN
) -> str:
    """MMR oracle: the greedy loop unrolled as a CTE chain (the
    `kmeans` unrolled-loop pattern).  `c0` scores e5-floored cosine
    relevance against the lowest-vec_id query with pen_e5 seeded at 0;
    each iteration then picks argmax(λ·rel − (1−λ)·pen) with a vec_id
    tie-break and folds the new pick into the surviving candidates'
    penalty via greatest() — the 0 seed makes the incremental max
    equal Spark's one-shot greatest(0, cos…) clamp.  All comparisons
    are BIGINT; list_cosine_similarity matches the Spark zip_with
    fold to ~1e-10, compared e5-floored (the semantic_dedup
    discipline)."""
    pen_w = lam_den - lam_num
    ctes = [
        f"""e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
  FROM embeddings
), q AS (
  SELECT vec_id AS q_id, emb AS q_emb FROM e ORDER BY vec_id LIMIT 1
), c0 AS (
  SELECT e.vec_id, e.emb,
    CAST(floor(list_cosine_similarity(e.emb, q.q_emb) * 100000) AS BIGINT)
      AS rel_e5,
    CAST(0 AS BIGINT) AS pen_e5
  FROM e, q WHERE e.vec_id <> q.q_id
), s1 AS (
  SELECT vec_id, emb, rel_e5, pen_e5,
    CAST({lam_num} * rel_e5 - {pen_w} * pen_e5 AS BIGINT) AS score_e5
  FROM c0
  ORDER BY {lam_num} * rel_e5 - {pen_w} * pen_e5 DESC, vec_id LIMIT 1
)"""
    ]
    for t in range(2, k + 1):
        ctes.append(
            f"""c{t - 1} AS (
  SELECT c.vec_id, c.emb, c.rel_e5,
    greatest(c.pen_e5,
      CAST(floor(list_cosine_similarity(c.emb, s.emb) * 100000) AS BIGINT)
    ) AS pen_e5
  FROM c{t - 2} c, s{t - 1} s WHERE c.vec_id <> s.vec_id
), s{t} AS (
  SELECT vec_id, emb, rel_e5, pen_e5,
    CAST({lam_num} * rel_e5 - {pen_w} * pen_e5 AS BIGINT) AS score_e5
  FROM c{t - 1}
  ORDER BY {lam_num} * rel_e5 - {pen_w} * pen_e5 DESC, vec_id LIMIT 1
)"""
        )
    sel = "\nUNION ALL\n".join(
        f"SELECT CAST({t} AS BIGINT) AS rnk, vec_id, rel_e5, pen_e5,"
        f" score_e5 FROM s{t}"
        for t in range(1, k + 1)
    )
    return "WITH " + ",\n".join(ctes) + "\n" + sel + "\n"


def q_embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 scalar quantization of the embedding store — the standard
    4× storage cut before ANN at 100 TB: per-dimension [min, max] over
    the corpus (one agg, k×dim output, float-EXACT so both engines
    agree bit-for-bit), codes = round((x-min)/(max-min)*255)-128
    shipped as a literal-scale expression, and the reconstruction
    error audited per label.  Scale shape: one min/max agg pass +
    a pure map — the quantization itself never shuffles.  All
    arithmetic is on identical doubles cross-engine; only the avg
    error is summation-ordered, hence rounded."""
    emb = _emb(spark, sf_dir)
    dim = 64
    aggs = []
    for i in range(dim):
        x = F.element_at("embedding", i + 1).cast("double")
        aggs += [F.min(x).alias(f"lo{i}"), F.max(x).alias(f"hi{i}")]
    b = emb.agg(*aggs).collect()[0]
    lo = [b[f"lo{i}"] for i in range(dim)]
    hi = [b[f"hi{i}"] for i in range(dim)]

    def code(i: int):
        x = F.element_at("embedding", i + 1).cast("double")
        span = hi[i] - lo[i]
        if span == 0.0:
            return F.lit(-128)
        return (F.round((x - F.lit(lo[i])) / F.lit(span) * 255) - 128).cast(
            "int"
        )

    def dequant(i: int):
        span = hi[i] - lo[i]
        return (code(i) + 128).cast("double") / 255.0 * F.lit(span) + F.lit(
            lo[i]
        )

    err = sum(
        (
            (F.element_at("embedding", i + 1).cast("double") - dequant(i))
            * (F.element_at("embedding", i + 1).cast("double") - dequant(i))
            for i in range(dim)
        ),
        start=F.lit(0.0),
    ) / F.lit(float(dim))
    code_sum = sum(
        (code(i).cast("long") for i in range(dim)),
        start=F.lit(0).cast("long"),
    )
    return (
        emb.select(
            "label",
            err.alias("mse"),
            code_sum.alias("code_sum"),
        )
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.round(F.avg("mse"), 9).alias("avg_mse"),
            F.sum("code_sum").cast("long").alias("code_checksum"),
        )
    )


def q_embedding_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return embedding_stats(_emb(spark, sf_dir))


# --- multimodal -------------------------------------------------------------------

def q_media_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return media_feature_counts(spark, sf_dir)


def q_media_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aspect-fit resize of every image payload over the REAL decoded
    PNG pixels — output dims/bytes are integer arithmetic on (w, h, ch),
    SQL-mirrored; the resized bytes themselves are pytest-locked
    (tests/test_multimodal.py) and stay out of the value compare."""
    from rxtls_spark.operators.multimodal import media_df, resize_media

    resized = resize_media(media_df(spark, sf_dir), box=32)
    return resized.select(
        "doc_id",
        "w",
        "h",
        "out_w",
        "out_h",
        F.col("out_bytes").cast("long").alias("out_bytes"),
    )


def q_media_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    frames = sample_frames(media_df(spark, sf_dir))
    return frames.agg(
        F.count(F.lit(1)).alias("n_frames"),
        F.countDistinct("doc_id").alias("n_videos"),
    )


def q_media_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio feature extraction over the REAL RIFF/WAVE payloads —
    the audio leg of the multimodal decode/feature-extract surface
    (images have phash/resize; video has frame sampling; this gives
    audio its RMS-energy + zero-crossing features): per clip the
    sample-rate/channel/frame metadata and two EXACT-integer
    features, sum_sq = Σs² and the strict sign-change count.

    Rows-only BY NATURE (the fifth such query, with content_hashes /
    domains_csv_lines / distinct_domains_approx / compression_ratio):
    samples come from the seeded RNG through a genuine WAV container
    — not SQL-expressible — so the driver row-checks and pytest
    locks the features bit-exact against an INDEPENDENT stdlib
    RIFF parse (tests/test_multimodal.py).

    Scale shape: pure Arrow-batched mapInPandas over the audio
    slice; integer outputs, no shuffle at all."""
    from rxtls_spark.operators.multimodal import audio_features, media_df

    return audio_features(media_df(spark, sf_dir))


def q_media_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash image dedup — the multimodal leg of the dedup
    family: every image payload is decoded through the REAL PNG codec
    and average-hashed (integer 8×8 aHash packed into two 32-bit
    halves, operators/multimodal.ahash_halves), then grouped on the
    hash — byte-identical images and re-encodes collapse into one
    group even where the container bytes differ (what `dedup_exact`
    on payload md5 cannot do).  Emits the keep-list: one row per hash
    group with its representative (min doc_id) and group size.

    Cross-engine: the hash VALUE depends on the seeded pixel content
    (not SQL-expressible), but the GROUPING is formula-determined —
    duplicates are injected by the PHASH_DUP_MOD/OFF payload-reuse
    rule (operators/multimodal.py, mirrored in the oracle), and for
    the fixed synthetic corpus distinct images never collide in the
    64-bit hash (pytest-locked), so group membership is exactly the
    canon formula both engines compute.  The hash bits themselves are
    pytest-locked against a Python replica, with the near-dup
    robustness contract (brightness shift ⇒ small Hamming distance).

    Scale shape: Arrow-batched decode (the expensive leg, embarrass-
    ingly parallel) → ONE hash agg on the 64-bit key — the exact-dedup
    plan with a perceptual key; output is corpus-scale (the keep-list,
    written not collected)."""
    from rxtls_spark.operators.multimodal import image_phash_df

    ph = image_phash_df(spark, sf_dir)
    return (
        ph.groupBy("phash_hi", "phash_lo")
        .agg(
            F.min("doc_id").cast("long").alias("rep_id"),
            F.count(F.lit(1)).cast("long").alias("n_dups"),
        )
        .select("rep_id", "n_dups")
    )


# --- session-5 additions: canonical selection, temperature mix, -----------
# --- Zipf fit, postings compression ----------------------------------------

def q_source_kl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source distribution-match audit: KL(source ‖ corpus) over
    the DSIR 64-bucket hashed-unigram feature space — the
    content-drift twin of `source_ks_drift` (which watches the quality
    score): a source whose token distribution diverges from the corpus
    gets flagged before it skews the mix.  Laplace-smoothed
    probabilities; exact cross-engine integers via the doremi/ccnet e3
    log discipline: kl_ne3 = Σ_b (c_b+1)·(⌊ln p_b·1e3⌋ − ⌊ln q_b·1e3⌋)
    — a pure BIGINT sum (order-free), bounded by n_s·max|Δln|·1e3
    (< 2^63 to ~200T tokens/source); kl_e3 normalizes by truncating
    DIV.  Floored-log noise bounds the result below by −(n_s+64), so
    true-KL ≥ 0 survives as kl_ne3 ≥ −(n_s+64) (pytest-locked).

    Scale shape: ONE corpus-scale hash agg to the (source × 64) grid;
    the dense fill, totals, and KL fold are all metadata-scale
    (sources × 64 rows), with the corpus bucket table a 64-row
    broadcast."""
    hexmap = _hex_digit_map()
    cnts = (
        _docs(spark, sf_dir)
        .where(F.trim("text") != "")
        .select("source", F.explode(_lm_tokens()).alias("tok"))
        .select("source", _token_bucket(F.col("tok"), hexmap).alias("bucket"))
        .groupBy("source", "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    srcs = cnts.select("source").distinct()
    buckets = spark.range(64).select(F.col("id").cast("int").alias("bucket"))
    sb = (
        srcs.crossJoin(F.broadcast(buckets))  # bounded: sources × 64
        .join(cnts, ["source", "bucket"], "left")
        .select(
            "source",
            "bucket",
            F.coalesce("c", F.lit(0).cast("long")).alias("c"),
        )
    )
    ns = sb.groupBy("source").agg(F.sum("c").cast("long").alias("n_s"))
    qb = sb.groupBy("bucket").agg(F.sum("c").cast("long").alias("cb"))
    nn = sb.agg(F.sum("c").cast("long").alias("n"))
    joined = (
        sb.join(ns, "source")
        .join(F.broadcast(qb), "bucket")
        .crossJoin(F.broadcast(nn))
    )
    lp = F.floor(
        F.log((F.col("c") + 1) / (F.col("n_s") + F.lit(64.0))) * 1000.0
    ).cast("long")
    lq = F.floor(
        F.log((F.col("cb") + 1) / (F.col("n") + F.lit(64.0))) * 1000.0
    ).cast("long")
    kl = joined.groupBy("source").agg(
        F.max("n_s").cast("long").alias("n_tokens"),
        F.sum((F.col("c") + 1) * (lp - lq)).cast("long").alias("kl_ne3"),
    )
    return kl.select(
        "source",
        "n_tokens",
        "kl_ne3",
        F.expr("kl_ne3 DIV (n_tokens + 64)").alias("kl_e3"),
    )


def q_source_jsd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jensen-Shannon divergence per source vs the corpus over the
    shared DSIR 64-bucket hashed-unigram space — the SYMMETRIC,
    bounded ([0, ln 2]) companion to `source_kl`: KL explodes when a
    source merely *misses* corpus mass, JSD stays finite and
    comparable across sources, which is what a mixture dashboard
    ranks by.  JSD = ½KL(P‖M) + ½KL(Q‖M), M the per-source mixture.

    Cross-engine: the Laplace-smoothed ratios p/m and q/m reduce to
    2A/(A+B) and 2B/(A+B) with A = (c+1)·(n+64), B = (cb+1)·(n_s+64)
    — computed in DOUBLE (cast before multiply: the BIGINT products
    overflow at ~10^13 tokens) with identical expression text, then
    the e3 ln-floor; both partial sums weight by the raw counts and
    normalize by truncating DIV at the end (the source_kl
    discipline), so everything after the floors is exact BIGINT.

    Scale shape: identical to source_kl — ONE corpus-scale hash agg
    to the (source × 64) grid; everything else metadata-scale."""
    hexmap = _hex_digit_map()
    cnts = (
        _docs(spark, sf_dir)
        .where(F.trim("text") != "")
        .select("source", F.explode(_lm_tokens()).alias("tok"))
        .select("source", _token_bucket(F.col("tok"), hexmap).alias("bucket"))
        .groupBy("source", "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    srcs = cnts.select("source").distinct()
    buckets = spark.range(64).select(F.col("id").cast("int").alias("bucket"))
    sb = (
        srcs.crossJoin(F.broadcast(buckets))  # bounded: sources × 64
        .join(cnts, ["source", "bucket"], "left")
        .select(
            "source",
            "bucket",
            F.coalesce("c", F.lit(0).cast("long")).alias("c"),
        )
    )
    ns = sb.groupBy("source").agg(F.sum("c").cast("long").alias("n_s"))
    qb = sb.groupBy("bucket").agg(F.sum("c").cast("long").alias("cb"))
    nn = sb.agg(F.sum("c").cast("long").alias("n"))
    joined = (
        sb.join(ns, "source")
        .join(F.broadcast(qb), "bucket")
        .crossJoin(F.broadcast(nn))
    )
    a_expr = "(CAST(c + 1 AS DOUBLE) * (n + 64))"
    b_expr = "(CAST(cb + 1 AS DOUBLE) * (n_s + 64))"
    lnpm = (
        f"CAST(floor(ln((2.0 * {a_expr}) / ({a_expr} + {b_expr}))"
        " * 1000.0) AS BIGINT)"
    )
    lnqm = (
        f"CAST(floor(ln((2.0 * {b_expr}) / ({a_expr} + {b_expr}))"
        " * 1000.0) AS BIGINT)"
    )
    agg = joined.groupBy("source").agg(
        F.max("n_s").cast("long").alias("n_tokens"),
        F.max("n").cast("long").alias("_n"),
        F.sum(F.expr(f"(c + 1) * ({lnpm})")).cast("long").alias("p_num"),
        F.sum(F.expr(f"(cb + 1) * ({lnqm})")).cast("long").alias("q_num"),
    )
    return agg.select(
        "source",
        "n_tokens",
        "p_num",
        "q_num",
        F.expr(
            "CAST((p_num DIV (n_tokens + 64) + q_num DIV (_n + 64))"
            " DIV 2 AS BIGINT)"
        ).alias("jsd_e3"),
    )


_SOURCE_JSD_SQL = """
WITH toks AS (
  SELECT source, regexp_split_to_array(trim(lower(text)), '[ \\t\\n\\x0B\\f\\r]+') AS t
  FROM documents WHERE trim(text) <> ''
), tok AS (
  SELECT source,
         ((strpos('0123456789abcdef', substr(md5(tk), 1, 1)) - 1) * 16
          + (strpos('0123456789abcdef', substr(md5(tk), 2, 1)) - 1)) % 64 AS bucket
  FROM (SELECT source, unnest(t) AS tk FROM toks)
), counts AS (
  SELECT source, bucket, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY 1, 2
), srcs AS (
  SELECT DISTINCT source FROM counts
), grid AS (
  SELECT s.source, g.b AS bucket FROM srcs s, generate_series(0, 63) g(b)
), sb AS (
  SELECT g.source, g.bucket, coalesce(c.c, 0) AS c
  FROM grid g LEFT JOIN counts c ON g.source = c.source AND g.bucket = c.bucket
), ns AS (
  SELECT source, CAST(sum(c) AS BIGINT) AS n_s FROM sb GROUP BY 1
), qb AS (
  SELECT bucket, CAST(sum(c) AS BIGINT) AS cb FROM sb GROUP BY 1
), nn AS (
  SELECT CAST(sum(c) AS BIGINT) AS n FROM sb
), js AS (
  SELECT sb.source, CAST(max(ns.n_s) AS BIGINT) AS n_tokens,
    CAST(max(nn.n) AS BIGINT) AS _n,
    CAST(sum((sb.c + 1) * (
      CAST(floor(ln((2.0 * (CAST(sb.c + 1 AS DOUBLE) * (nn.n + 64)))
                    / ((CAST(sb.c + 1 AS DOUBLE) * (nn.n + 64))
                       + (CAST(qb.cb + 1 AS DOUBLE) * (ns.n_s + 64))))
                 * 1000.0) AS BIGINT)
    )) AS BIGINT) AS p_num,
    CAST(sum((qb.cb + 1) * (
      CAST(floor(ln((2.0 * (CAST(qb.cb + 1 AS DOUBLE) * (ns.n_s + 64)))
                    / ((CAST(sb.c + 1 AS DOUBLE) * (nn.n + 64))
                       + (CAST(qb.cb + 1 AS DOUBLE) * (ns.n_s + 64))))
                 * 1000.0) AS BIGINT)
    )) AS BIGINT) AS q_num
  FROM sb JOIN ns ON sb.source = ns.source
          JOIN qb ON sb.bucket = qb.bucket, nn
  GROUP BY 1
)
SELECT source, n_tokens, p_num, q_num,
       CAST((p_num // (n_tokens + 64) + q_num // (_n + 64)) // 2
            AS BIGINT) AS jsd_e3
FROM js
"""


def q_source_minhash_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-to-source VOCABULARY similarity, sketch vs truth: the
    exact Jaccard of the distinct-token sets next to its
    ``CAL_PERMS``-permutation minhash estimate (Broder 1997) — the
    corpus-granularity member of the dedup family (doc-level =
    dedup_minhash_lsh; pairwise trust = minhash_calibration; this
    answers "can I compare whole SOURCES by signature instead of
    shuffling their vocabularies?"), with the signed error per pair
    as the go/no-go evidence.

    Cross-engine: the permutation family is the minhash_calibration
    spec verbatim (h_k(x) = (((x + k·CAL_STEP) % P)·A) % P on the
    md5-13-hex key — CAL_* constants flow in); signatures are exact
    BIGINT mins, intersection an equi-join count, jacc/est/err
    truncating-DIV e5 integers.

    Scale shape: ONE distinct (source, tok) hash agg feeds BOTH
    sides — the signature (a sources×PERMS bounded agg, map-side
    partial) and the exact intersection (one token-keyed equi-join);
    the pair tables are bounded sources²."""
    from rxtls_spark.functions.hashing import KNUTH_A, KNUTH_P

    st = (
        _docs(spark, sf_dir)
        .where(F.trim("text") != "")
        .select("source", F.explode(F.array_distinct(_lm_tokens())).alias("tok"))
        .distinct()
        .withColumn(
            "x", F.expr("CAST(conv(substring(md5(tok), 1, 13), 16, 10) AS BIGINT)")
        )
        .localCheckpoint(eager=False)
    )
    sizes = st.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_set")
    )
    sig = st.groupBy("source").agg(
        *[
            F.min(
                F.expr(
                    f"(((x + {k} * {CAL_STEP}) % {KNUTH_P})"
                    f" * {KNUTH_A}) % {KNUTH_P}"
                )
            )
            .cast("long")
            .alias(f"h{k}")
            for k in range(CAL_PERMS)
        ]
    )
    a, b = st.alias("a"), st.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.tok") == F.col("b.tok"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("inter"))
    )
    sa, sb = sig.alias("sa"), sig.alias("sb")
    match_expr = " + ".join(
        f"CASE WHEN sa.h{k} = sb.h{k} THEN 1 ELSE 0 END"
        for k in range(CAL_PERMS)
    )
    matches = sa.join(
        sb, F.col("sa.source") < F.col("sb.source")
    ).select(
        F.col("sa.source").alias("source_a"),
        F.col("sb.source").alias("source_b"),
        F.expr(f"CAST({match_expr} AS BIGINT)").alias("matches"),
    )
    na = sizes.select(
        F.col("source").alias("source_a"), F.col("n_set").alias("n_a")
    )
    nb = sizes.select(
        F.col("source").alias("source_b"), F.col("n_set").alias("n_b")
    )
    return (
        matches.join(inter, ["source_a", "source_b"], "left")
        .join(F.broadcast(na), "source_a")
        .join(F.broadcast(nb), "source_b")
        .select(
            "source_a",
            "source_b",
            "n_a",
            "n_b",
            F.expr("CAST(coalesce(inter, 0) AS BIGINT)").alias("inter"),
            F.expr(
                "CAST((coalesce(inter, 0) * 100000)"
                " DIV (n_a + n_b - coalesce(inter, 0)) AS BIGINT)"
            ).alias("jacc_e5"),
            "matches",
            F.expr(
                f"CAST((matches * 100000) DIV {CAL_PERMS} AS BIGINT)"
            ).alias("est_e5"),
            F.expr(
                f"CAST((matches * 100000) DIV {CAL_PERMS}"
                " - (coalesce(inter, 0) * 100000)"
                " DIV (n_a + n_b - coalesce(inter, 0)) AS BIGINT)"
            ).alias("err_e5"),
        )
    )


def _source_minhash_jaccard_sql(
    perms: int | None = None, step: int | None = None
) -> str:
    """source_minhash_jaccard oracle: identical distinct-token chain,
    the calibration permutation family on the '0x'-cast md5-13-hex
    key, per-perm min columns, equi-join intersection, e5 DIVs."""
    from rxtls_spark.functions.hashing import KNUTH_A, KNUTH_P

    perms = CAL_PERMS if perms is None else perms
    step = CAL_STEP if step is None else step

    hs = ",\n         ".join(
        f"CAST(min((((x + {k} * {step}) % {KNUTH_P}) * {KNUTH_A})"
        f" % {KNUTH_P}) AS BIGINT) AS h{k}"
        for k in range(perms)
    )
    match_expr = " + ".join(
        f"CASE WHEN sa.h{k} = sb.h{k} THEN 1 ELSE 0 END"
        for k in range(perms)
    )
    return f"""
WITH st AS MATERIALIZED (
  SELECT DISTINCT source, tok,
         CAST(('0x' || substr(md5(tok), 1, 13)) AS BIGINT) AS x
  FROM (
    SELECT source, unnest(list_distinct(
      regexp_split_to_array(trim(lower(text)), '[ \\t\\n\\x0B\\f\\r]+'))) AS tok
    FROM documents WHERE trim(text) <> '')
), sizes AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_set FROM st GROUP BY 1
), sig AS (
  SELECT source,
         {hs}
  FROM st GROUP BY 1
), inter AS (
  SELECT a.source AS source_a, b.source AS source_b,
         CAST(count(*) AS BIGINT) AS inter
  FROM st a JOIN st b ON a.tok = b.tok AND a.source < b.source
  GROUP BY 1, 2
), m AS (
  SELECT sa.source AS source_a, sb.source AS source_b,
         CAST({match_expr} AS BIGINT) AS matches
  FROM sig sa JOIN sig sb ON sa.source < sb.source
)
SELECT m.source_a, m.source_b,
       na.n_set AS n_a, nb.n_set AS n_b,
       CAST(coalesce(i.inter, 0) AS BIGINT) AS inter,
       CAST((coalesce(i.inter, 0) * 100000)
            // (na.n_set + nb.n_set - coalesce(i.inter, 0)) AS BIGINT)
         AS jacc_e5,
       m.matches,
       CAST((m.matches * 100000) // {perms} AS BIGINT) AS est_e5,
       CAST((m.matches * 100000) // {perms}
            - (coalesce(i.inter, 0) * 100000)
            // (na.n_set + nb.n_set - coalesce(i.inter, 0)) AS BIGINT)
         AS err_e5
FROM m LEFT JOIN inter i USING (source_a, source_b)
       JOIN sizes na ON m.source_a = na.source
       JOIN sizes nb ON m.source_b = nb.source
"""


# Compressibility gate: ratio ≥ COMPRESS_GATE_E3/1e3 flags
# templated/repetitive text (the Gopher-style deflate filter); 2.3×
# sits at ~p90 of the smoke-corpus ratio distribution (measured —
# the TT_DEPTH_CUT tuning rule; natural prose lands ~2.0×).  No
# DuckDB oracle BY NATURE (zlib isn't expressible in SQL) — the
# driver records the rows-only check and pytest locks bytes exactly
# (the content_hashes/xxh3 precedent).
COMPRESS_GATE_E3 = 2300


def _zlib_len_udf():
    """Arrow-batched zlib(level=6) compressed-length UDF — built
    lazily so the module imports without a Spark session; marked
    nondeterministic so Catalyst plans it exactly once (the parse-UDF
    invariant)."""
    import zlib

    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import LongType

    @pandas_udf(LongType())
    def zlen(texts: pd.Series) -> pd.Series:
        return texts.map(
            lambda t: len(zlib.compress(t.encode("utf-8"), 6))
        ).astype("int64")

    return zlen.asNondeterministic()


def q_compression_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document deflate compressibility (the Gopher/MassiveText
    repetition screen, Rae et al. 2021 §A1.3: heavily-templated text
    compresses far below natural prose): raw bytes, zlib-6 bytes,
    ratio_e3 = (n_bytes·1e3) DIV z_bytes, and the ≥2.3× gate flag.
    The CODEC-level complement of `repetition` (surface n-gram
    folds) and `char_entropy` (unigram model): deflate's LZ77 window
    catches long-range duplication both miss.

    No SQL oracle by nature (zlib in DuckDB does not exist) — the
    driver records rows-only; pytest locks the bytes against Python
    zlib directly and the plan to ONE ArrowEvalPython.

    Scale shape: one Arrow-batched pandas UDF projection (the
    lm_score_broadcast plan class — 0 exchanges, no join); zlib is
    the per-row cost and is exactly the work the operator exists to
    spend."""
    z = _zlib_len_udf()
    docs = (
        _docs(spark, sf_dir)
        .select("doc_id", "text")
        .where(F.trim("text") != "")
    )
    return docs.select(
        "doc_id",
        F.octet_length("text").cast("long").alias("n_bytes"),
        z(F.col("text")).alias("z_bytes"),
    ).select(
        "doc_id",
        "n_bytes",
        "z_bytes",
        F.expr("CAST((n_bytes * 1000) DIV z_bytes AS BIGINT)").alias(
            "ratio_e3"
        ),
        F.expr(
            f"CAST(CASE WHEN (n_bytes * 1000) DIV z_bytes"
            f" >= {COMPRESS_GATE_E3} THEN 1 ELSE 0 END AS BIGINT)"
        ).alias("is_templated"),
    )


# Geometric-median spec — MIRRORED in `_source_geomedian_sql`;
# change together.  Weiszfeld over the first GM_DIM dims of the
# embedding (the matryoshka prefix convention keeps the unrolled SQL
# bounded), GM_ITERS fixed-point steps from the 6-dp floor-stable
# mean (the kmeans centroid discipline — floor(x·1e6+0.5)/1e6 after
# EVERY iteration so float-sum-order noise can't propagate);
# zero-distance points drop out of the step (w = 0), and a source
# whose weights all vanish keeps its previous iterate.
GM_DIM = 8
GM_ITERS = 3


def q_source_geomedian(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source geometric median of embeddings (Weiszfeld 1937; the
    robust-statistics centroid Cohen et al. 2016 scaled) — the
    outlier-resistant twin of `source_centroid_sim`'s MEAN centroid:
    one poisoned/outlier vector drags a mean arbitrarily far but
    moves the geometric median at most marginally (breakdown point
    1/2), so robust data-poisoning audits compare the two.  Emits
    per (source, dim): n_vecs, the mean (e6) and the Weiszfeld
    iterate (e6) — their gap IS the outlier signal.

    Cross-engine: the iteration runs over per-source aggregates with
    6-dp floor-stable rounding after every step (the
    train_ivf_centroids contract — sum-order ulp noise cannot cross
    the 5e-7 grid); d = sqrt of the index-order squared fold and
    w = 1/d are IEEE on identical literals; Spark holds the
    (sources × 8) iterate on the driver as literals (the kmeans/
    bradley_terry precedent) while DuckDB unrolls y0..y{iters} CTEs.

    Scale shape: ONE corpus-scale agg per iteration (sources × 8
    outputs, map-side partial — the kmeans loop shape, no explode);
    the join side is the broadcast iterate table."""
    import math

    docs = _docs(spark, sf_dir).select("doc_id", "source")
    emb = _emb(spark, sf_dir)
    base = (
        docs.join(emb, docs["doc_id"] == emb["vec_id"])
        .select(
            "source",
            *[
                F.element_at("embedding", d + 1)
                .cast("double")
                .alias(f"x{d}")
                for d in range(GM_DIM)
            ],
        )
        .localCheckpoint(eager=False)
    )

    def stable6(v: float) -> float:
        return math.floor(v * 1e6 + 0.5) / 1e6

    m0 = base.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        *[F.avg(f"x{d}").alias(f"m{d}") for d in range(GM_DIM)],
    ).collect()
    n_vecs = {r["source"]: r["n"] for r in m0}
    mean = {
        r["source"]: [stable6(float(r[f"m{d}"])) for d in range(GM_DIM)]
        for r in m0
    }
    y = {s: list(v) for s, v in mean.items()}
    for _ in range(GM_ITERS):
        ydf = spark.createDataFrame(
            [(s, *v) for s, v in sorted(y.items())],
            "source string, "
            + ", ".join(f"y{d} double" for d in range(GM_DIM)),
        )
        sq = " + ".join(
            f"((x{d} - y{d}) * (x{d} - y{d}))" for d in range(GM_DIM)
        )
        w = F.expr(
            f"CASE WHEN sqrt({sq}) > 0.0 THEN 1.0 / sqrt({sq})"
            " ELSE 0.0 END"
        )
        agg = (
            base.join(F.broadcast(ydf), "source")
            .select("source", w.alias("w"), *[f"x{d}" for d in range(GM_DIM)])
            .groupBy("source")
            .agg(
                F.sum("w").alias("sw"),
                *[
                    F.sum(F.col("w") * F.col(f"x{d}")).alias(f"s{d}")
                    for d in range(GM_DIM)
                ],
            )
            .collect()
        )
        for r in agg:
            if float(r["sw"]) > 0.0:
                y[r["source"]] = [
                    stable6(float(r[f"s{d}"]) / float(r["sw"]))
                    for d in range(GM_DIM)
                ]
    rows = []
    for s in sorted(y):
        for d in range(GM_DIM):
            rows.append(
                (
                    s,
                    d + 1,
                    int(n_vecs[s]),
                    math.floor(mean[s][d] * 1e6 + 0.5),
                    math.floor(y[s][d] * 1e6 + 0.5),
                )
            )
    return spark.createDataFrame(
        rows,
        "source string, dim long, n_vecs long, mean_e6 long, gmed_e6 long",
    )


def _source_geomedian_sql(
    dim: int = GM_DIM, iters: int = GM_ITERS
) -> str:
    """source_geomedian oracle: the doc→embedding join sliced to the
    prefix dims, the 6-dp floor-stable mean as y0, each Weiszfeld
    step unrolled as (w, y) CTE pairs with the identical index-order
    distance fold, then an 8-branch UNION ALL long format."""
    xs = ", ".join(
        f"CAST(e.embedding[{d + 1}] AS DOUBLE) AS x{d}"
        for d in range(dim)
    )
    head = f"""WITH base AS MATERIALIZED (
  SELECT d.source, {xs}
  FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
), y0 AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n,
         {", ".join(f"floor(avg(x{d}) * 1000000 + 0.5) / 1000000 AS m{d}"
                    for d in range(dim))}
  FROM base GROUP BY source
)"""
    for t in range(1, iters + 1):
        sq = " + ".join(
            f"((b.x{d} - y.m{d}) * (b.x{d} - y.m{d}))" for d in range(dim)
        )
        head += f""",
w{t} AS (
  SELECT b.source,
         CASE WHEN sqrt({sq}) > 0.0 THEN 1.0 / sqrt({sq})
              ELSE 0.0 END AS w,
         {", ".join(f"b.x{d}" for d in range(dim))}
  FROM base b JOIN y{t - 1} y USING (source)
), y{t} AS (
  SELECT w.source, y.n,
         {", ".join(
            f"CASE WHEN sum(w.w) > 0.0 THEN"
            f" floor(sum(w.w * w.x{d}) / sum(w.w) * 1000000 + 0.5)"
            f" / 1000000 ELSE max(y.m{d}) END AS m{d}"
            for d in range(dim))}
  FROM w{t} w JOIN y{t - 1} y USING (source)
  GROUP BY w.source, y.n
)"""
    branches = "\nUNION ALL\n".join(
        f"""SELECT a.source, CAST({d + 1} AS BIGINT) AS dim,
       CAST(a.n AS BIGINT) AS n_vecs,
       CAST(floor(a.m{d} * 1000000 + 0.5) AS BIGINT) AS mean_e6,
       CAST(floor(b.m{d} * 1000000 + 0.5) AS BIGINT) AS gmed_e6
FROM y0 a JOIN y{iters} b USING (source)"""
        for d in range(dim)
    )
    return head + "\n" + branches


def q_cluster_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-representative selection per duplicate cluster — the
    production rule real pipelines use instead of keep-min-id: keep the
    LONGEST member of each near-dup cluster (tie → min doc_id), since
    truncated/boilerplate-stripped variants are usually the shorter
    ones.  Composes connected components over the deterministic pair
    graph (the `dedup_clusters` plumbing) with an argmax-by-(n_chars
    DESC, doc_id) window per cluster, so DuckDB mirrors the whole
    closure + selection with WITH RECURSIVE + row_number.

    Scale shape: CC is the proven min-label loop (one equi-join + one
    partial agg per round); the argmax is ONE window over cluster_root
    — clusters are near-cliques of bounded size, so the partition sort
    never spills.  Proves the keep rule is genuinely configurable, not
    an accident of min-id: the near-copies (' extra!' suffix) are the
    LONGER members, so canon differs from cluster_root on every near
    cluster and any regression to min-id flips those rows."""
    from pyspark.sql.window import Window

    from rxtls_spark.operators.cluster import connected_components

    docs = _docs(spark, sf_dir)
    injected = with_injected_dups(docs)
    pairs = _deterministic_pair_graph(docs, injected)
    cc = connected_components(pairs)
    members = cc.join(
        injected.select("doc_id", F.length("text").alias("n_chars")),
        "doc_id",
    )
    w = Window.partitionBy("cluster_root").orderBy(
        F.col("n_chars").desc(), F.col("doc_id")
    )
    ranked = members.withColumn("rk", F.row_number().over(w))
    canon = ranked.where(F.col("rk") == 1).select(
        "cluster_root", F.col("doc_id").alias("canon_id")
    )
    return (
        ranked.join(canon, "cluster_root")
        .select(
            "doc_id",
            "cluster_root",
            "canon_id",
            F.col("n_chars").cast("long").alias("n_chars"),
            (F.col("doc_id") == F.col("canon_id")).cast("long").alias("keep"),
        )
    )


def q_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled multilingual sampling weights (the mBERT /
    XLM-R / mT5 rule): sampling share ∝ n_tokens^α with α = 0.5, which
    up-weights low-resource languages relative to their natural share.
    Exact cross-engine: IEEE sqrt is correctly rounded, so
    w_e3 = floor(sqrt(n_tokens)·1e3) is the identical BIGINT on Spark
    and DuckDB, and everything after (share, per-epoch token
    allocation) is integer DIV on BIGINTs.

    Scale shape: ONE corpus-scale hash agg (per-lang doc/token counts);
    the weight normalization is a tiny per-lang frame joined back via a
    1-row broadcast crossJoin — metadata-scale, the proven
    `mixture_sample` pattern.  Completes the mix family: training_mix =
    observed mix, mixture_sample = rate-based, unimax = epoch-capped,
    this = temperature-smoothed target shares."""
    agg = (
        _docs(spark, sf_dir)
        .select("lang", token_count().alias("n_tokens"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("n_tokens"),
        )
    )
    # e3 weight grid: w_e3·1e9 must stay < 2^63, which holds while a
    # language has < 8.5e13 tokens (~85T — far past the 100 TB mandate);
    # an e5 grid would overflow at ~20T tokens/lang
    weighted = agg.withColumn(
        "w_e3",
        F.floor(F.sqrt(F.col("n_tokens").cast("double")) * 1000.0).cast(
            "long"
        ),
    )
    totals = weighted.agg(
        F.sum("w_e3").cast("long").alias("tot_w"),
        F.sum("n_tokens").cast("long").alias("tot_tokens"),
    )
    return (
        weighted.crossJoin(F.broadcast(totals))  # 1-row scalar join
        .select(
            "lang",
            "n_docs",
            "n_tokens",
            "w_e3",
            F.expr("(w_e3 * 1000000000) DIV tot_w").alias("share_e9"),
            # floor(share_e9·T/1e9) decomposed as share·q + share·r DIV 1e9
            # (T = q·1e9 + r) — exact, and every operand stays < 2^63 even
            # at 10^18 corpus tokens (share_e9·T directly would overflow)
            F.expr(
                "((w_e3 * 1000000000) DIV tot_w) * (tot_tokens DIV 1000000000)"
                " + (((w_e3 * 1000000000) DIV tot_w)"
                "    * (tot_tokens % 1000000000)) DIV 1000000000"
            ).alias("alloc_tokens"),
            F.expr("(n_tokens * 1000000000) DIV tot_tokens").alias(
                "natural_e9"
            ),
        )
    )


# Zipf-fit spec — MIRRORED in the `zipf_alpha` oracle SQL; change
# together.  The slope is an exact-integer OLS on e3-floored logs:
# x = floor(ln(rank)*1e3), y = floor(ln(cnt)*1e3) (the doremi/ccnet e3
# log discipline), num = k·Σxy − Σx·Σy, den = k·Σxx − (Σx)², and
# slope_e6 = (num·1e6) DIV den — num is negative, and BOTH engines
# truncate integer division toward zero, so the quotient is identical.
ZIPF_TOPK = 32


def q_zipf_alpha(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source Zipf-law fit — the corpus-health check a web-scale
    ingest runs per crawl/source: the OLS slope of ln(count) vs
    ln(rank) over the source's top-``ZIPF_TOPK`` tokens.  Natural text
    sits near slope −1; a source drifting toward 0 (flat counts =
    template spam) or −3 (a few tokens dominate = boilerplate) fails
    review.  Exact cross-engine via e3-floored logs + integer OLS (see
    ZIPF_TOPK note).

    Scale shape: ONE corpus-scale (source, token) hash agg; the
    per-source top-k is a window over sources (few and fat → per-
    partition top-k merge, the `stratified_sample` shape); the OLS sums
    are a sources×K metadata-scale agg."""
    from pyspark.sql.window import Window

    docs = (
        _docs(spark, sf_dir)
        .select("source", "text")
        .where(F.trim("text") != "")
    )
    cnt = (
        docs.select("source", F.explode(_lm_tokens()).alias("tok"))
        .groupBy("source", "tok")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    w = Window.partitionBy("source").orderBy(F.col("cnt").desc(), "tok")
    top = cnt.withColumn("rk", F.row_number().over(w)).where(
        F.col("rk") <= ZIPF_TOPK
    )
    xy = top.select(
        "source",
        F.floor(F.log(F.col("rk").cast("double")) * 1000.0)
        .cast("long")
        .alias("x"),
        F.floor(F.log(F.col("cnt").cast("double")) * 1000.0)
        .cast("long")
        .alias("y"),
    )
    sums = xy.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
    )
    return sums.select(
        "source",
        "k",
        "sy",
        F.expr(
            "((k * sxy - sx * sy) * 1000000) DIV (k * sxx - sx * sx)"
        ).alias("slope_e6"),
    )


# FIM transform constants — MIRRORED in the `fim_transform` oracle
# SQL; change together.  FIM_RATE is the permille of docs transformed
# (the knuth-permille gate); cut points derive from knuth hashes of
# doc_id and 2*doc_id+1 so both are pure integer functions of the row.
FIM_RATE = 500
FIM_PRE, FIM_SUF, FIM_MID = "<PRE>", "<SUF>", "<MID>"

# BERT masked-LM constants — MIRRORED in `_mlm_sql`; change together.
# Per-token permille draw r = knuth(doc_id·MLM_POS_SALT + i) % 1000:
# r < MLM_MASK_TO is [MASK], < MLM_RAND_TO is a random in-doc token
# (index from a second knuth draw — corpus-closed, no vocab table),
# < MLM_KEEP_TO is keep-but-predict; else untouched.  The 120/135/150
# cuts are the canonical 15% × (80/10/10) split.
MLM_POS_SALT = 1009
MLM_RAND_SALT = 31
MLM_MASK_TO = 120
MLM_RAND_TO = 135
MLM_KEEP_TO = 150
MLM_MASK = "[MASK]"


def q_mlm_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BERT-style masked-LM training transform (Devlin et al. 2019
    §3.1: mask 15% of tokens — 80% to [MASK], 10% to a random token,
    10% kept but still predicted) — completing the training-transform
    family: causal (identity), `fim_transform` (infilling),
    `span_corrupt` (seq2seq denoising), and now MLM (bidirectional
    denoising).  Emits the corrupted stream and the prediction-target
    stream as md5s plus the exact per-class counts.

    Cross-engine: every per-token decision is a pure knuth-integer
    function of (doc_id, position); the random replacement draws an
    IN-DOC index (corpus-closed — no vocab side table to drift);
    streams are built as ONE transformed array then space-joined.

    Scale shape: pure per-row Catalyst map (transform/filter over the
    token array) — zero exchanges, no explode."""
    docs = (
        _docs(spark, sf_dir)
        .select("doc_id", "text")
        .where(F.trim("text") != "")
    )
    base = docs.select("doc_id", _lm_tokens().alias("t")).select(
        "doc_id", "t", F.size("t").alias("n")
    )

    def draw(i: F.Column) -> F.Column:
        return knuth_hash(F.col("doc_id") * MLM_POS_SALT + i) % 1000

    def rand_tok(i: F.Column) -> F.Column:
        idx = (
            knuth_hash(F.col("doc_id") * MLM_RAND_SALT + i)
            % F.col("n").cast("long")
        ).cast("int")
        return F.element_at(F.col("t"), idx + 1)

    masked = F.transform(
        F.sequence(F.lit(1), F.col("n")),
        lambda i: F.when(draw(i) < MLM_MASK_TO, F.lit(MLM_MASK))
        .when(draw(i) < MLM_RAND_TO, rand_tok(i))
        .otherwise(F.element_at(F.col("t"), i)),
    )
    labels = F.filter(
        F.transform(
            F.sequence(F.lit(1), F.col("n")),
            lambda i: F.when(
                draw(i) < MLM_KEEP_TO, F.element_at(F.col("t"), i)
            ),
        ),
        lambda x: x.isNotNull(),
    )

    def cnt(lo: int, hi: int) -> F.Column:
        return F.size(
            F.filter(
                F.sequence(F.lit(1), F.col("n")),
                lambda i: (draw(i) >= lo) & (draw(i) < hi),
            )
        ).cast("long")

    return base.select(
        "doc_id",
        F.col("n").cast("long").alias("n"),
        cnt(0, MLM_KEEP_TO).alias("n_masked"),
        cnt(0, MLM_MASK_TO).alias("n_mask_tok"),
        cnt(MLM_MASK_TO, MLM_RAND_TO).alias("n_rand"),
        F.md5(F.concat_ws(" ", masked)).alias("input_md5"),
        F.md5(F.concat_ws(" ", labels)).alias("labels_md5"),
    )


def _mlm_sql() -> str:
    """mlm_transform oracle: identical knuth per-position draws,
    in-doc random replacement, single-array builds."""
    kh = lambda expr: f"((({expr}) % {KNUTH_P}) * {KNUTH_A}) % {KNUTH_P}"  # noqa: E731
    r = kh(f"doc_id * {MLM_POS_SALT} + i") + " % 1000"
    ridx = f"1 + ({kh(f'doc_id * {MLM_RAND_SALT} + i')}) % n"
    return f"""
WITH toks AS (
  SELECT doc_id,
         regexp_split_to_array(trim(lower(text)),
                               '[ \\t\\n\\x0B\\f\\r]+') AS t
  FROM documents WHERE trim(text) <> ''
), base AS (
  SELECT doc_id, t, len(t) AS n FROM toks
)
SELECT doc_id, CAST(n AS BIGINT) AS n,
  CAST(len(list_filter(generate_series(1, n),
       i -> ({r}) < {MLM_KEEP_TO})) AS BIGINT) AS n_masked,
  CAST(len(list_filter(generate_series(1, n),
       i -> ({r}) < {MLM_MASK_TO})) AS BIGINT) AS n_mask_tok,
  CAST(len(list_filter(generate_series(1, n),
       i -> ({r}) >= {MLM_MASK_TO} AND ({r}) < {MLM_RAND_TO}))
       AS BIGINT) AS n_rand,
  md5(array_to_string(list_transform(generate_series(1, n),
       i -> CASE WHEN ({r}) < {MLM_MASK_TO} THEN '{MLM_MASK}'
                 WHEN ({r}) < {MLM_RAND_TO} THEN t[{ridx}]
                 ELSE t[i] END), ' ')) AS input_md5,
  -- array_to_string([]) is NULL in DuckDB, '' in Spark's concat_ws
  md5(coalesce(array_to_string(list_transform(
       list_filter(generate_series(1, n), i -> ({r}) < {MLM_KEEP_TO}),
       i -> t[i]), ' '), '')) AS labels_md5
FROM base
"""


# NSP pair constants — MIRRORED in `_nsp_sql`; change together.
# Partner = doc_id + 1 + knuth(3·doc_id) % NSP_JUMP_MOD (a small
# forward jump — a co-partitionable equi-join key, never a global
# shuffle of random ids); the pair is NotNext when the partner EXISTS
# and knuth(NSP_SALT·doc_id) % 1000 < NSP_RATE, else IsNext (missing
# partners fall back to IsNext so every eligible doc emits exactly
# one pair).
NSP_JUMP_MOD = 5
NSP_RATE = 500
NSP_SALT = 7
NSP_SEP = "[SEP]"


def q_nsp_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BERT next-sentence-prediction pair construction (Devlin et al.
    2019 §3.1 task #2) — the LAST member of the training-transform
    family (causal / `fim_transform` / `span_corrupt` /
    `mlm_transform` / this): each document with ≥2 tokens splits into
    halves (segA, segB); half the pairs keep their own continuation
    (IsNext), the other half swap segB for a nearby document's
    continuation (NotNext), and the model trains to tell them apart.
    Emits the label, the partner used, both segment lengths, and the
    md5 of the packed `segA [SEP] segB` stream.

    Cross-engine: the half split is the minhash_calibration slice
    rule (Spark slice == DuckDB 1-based inclusive list slice; n ≥ 2
    keeps both halves non-empty, sidestepping the empty-array NULL
    gotcha); the partner is a deterministic knuth forward jump; the
    packed stream is ONE concatenated array then space-joined (the
    fim rule).

    Scale shape: pure per-row maps plus ONE co-partitioned self
    equi-join on the computed partner key (both sides hash-partition
    on a BIGINT id — no broadcast of the corpus, no global window
    anywhere).  The partner key assumes the reference's dense BIGINT
    doc_id space (the holdout/knuth-permille precedent); sparse id
    spaces would jump via a rank instead."""
    docs = (
        _docs(spark, sf_dir)
        .select("doc_id", "text")
        .where(F.trim("text") != "")
    )
    halves = (
        docs.select("doc_id", _lm_tokens().alias("t"))
        .select("doc_id", "t", F.size("t").alias("n"))
        .where(F.col("n") >= 2)
        .select(
            "doc_id",
            F.expr("slice(t, 1, n DIV 2)").alias("seg_a"),
            F.expr("slice(t, n DIV 2 + 1, n - n DIV 2)").alias("seg_b"),
        )
    )
    left = halves.select(
        "doc_id",
        "seg_a",
        "seg_b",
        (
            F.col("doc_id")
            + 1
            + knuth_hash(F.col("doc_id") * 3) % NSP_JUMP_MOD
        ).alias("partner_id"),
        (knuth_hash(F.col("doc_id") * NSP_SALT) % 1000).alias("draw"),
    )
    partner = halves.select(
        F.col("doc_id").alias("partner_id"),
        F.col("seg_b").alias("pb"),
    )
    j = left.join(partner, "partner_id", "left")
    is_next = F.when(
        F.col("pb").isNull() | (F.col("draw") >= NSP_RATE), F.lit(1)
    ).otherwise(F.lit(0))
    chosen = F.when(is_next == 1, F.col("seg_b")).otherwise(F.col("pb"))
    return j.select(
        "doc_id",
        "partner_id",
        is_next.cast("long").alias("is_next"),
        F.size("seg_a").cast("long").alias("n_a"),
        F.size(chosen).cast("long").alias("n_b"),
        F.md5(
            F.concat_ws(
                " ",
                F.concat(
                    F.col("seg_a"), F.array(F.lit(NSP_SEP)), chosen
                ),
            )
        ).alias("pair_md5"),
    )


def _nsp_sql() -> str:
    """nsp_pairs oracle: identical half slices, knuth partner jump
    and NotNext draw, left-join partner lookup, single-array pack."""
    kh3 = f"(((doc_id * 3) % {KNUTH_P}) * {KNUTH_A}) % {KNUTH_P}"
    khs = f"(((doc_id * {NSP_SALT}) % {KNUTH_P}) * {KNUTH_A}) % {KNUTH_P}"
    return f"""
WITH toks AS (
  SELECT doc_id,
         regexp_split_to_array(trim(lower(text)),
                               '[ \\t\\n\\x0B\\f\\r]+') AS t
  FROM documents WHERE trim(text) <> ''
), halves AS (
  SELECT doc_id,
         t[1:len(t) // 2] AS seg_a,
         t[len(t) // 2 + 1:len(t)] AS seg_b
  FROM toks WHERE len(t) >= 2
), lft AS (
  SELECT doc_id, seg_a, seg_b,
         doc_id + 1 + ({kh3}) % {NSP_JUMP_MOD} AS partner_id,
         ({khs}) % 1000 AS draw
  FROM halves
), j AS (
  SELECT l.*, p.seg_b AS pb
  FROM lft l LEFT JOIN halves p ON p.doc_id = l.partner_id
)
SELECT doc_id, partner_id,
  CAST(CASE WHEN pb IS NULL OR draw >= {NSP_RATE} THEN 1 ELSE 0 END
       AS BIGINT) AS is_next,
  CAST(len(seg_a) AS BIGINT) AS n_a,
  CAST(len(CASE WHEN pb IS NULL OR draw >= {NSP_RATE} THEN seg_b
                ELSE pb END) AS BIGINT) AS n_b,
  md5(array_to_string(list_concat(list_concat(seg_a, ['{NSP_SEP}']),
       CASE WHEN pb IS NULL OR draw >= {NSP_RATE} THEN seg_b
            ELSE pb END), ' ')) AS pair_md5
FROM j
"""


# Random-projection constants — MIRRORED in `_random_projection_sql`;
# change together.  Signs are ±1 from knuth parity of
# RP_SIGN_SALT·(j·dim + i), computed ONCE in Python and spliced into
# BOTH engines as literals (the `_ndcg_weights` rule — no engine
# hashing in the fold); components floor to e4 BIGINTs so the
# projected pair distance pd2·1e5 stays < 2^63 at dim 64
# (e5 floors would overflow the ratio numerator).
RP_DIM = 8
RP_SIGN_SALT = 9176


def _rp_signs(dim: int = KMEANS_DIM) -> list[list[int]]:
    """signs[j][i] ∈ {+1, −1} for output coord j, input coord i."""
    from rxtls_spark.functions.hashing import KNUTH_A, KNUTH_P

    return [
        [
            1
            - 2
            * (
                ((RP_SIGN_SALT * (j * dim + i) % KNUTH_P) * KNUTH_A)
                % KNUTH_P
                % 2
            )
            for i in range(dim)
        ]
        for j in range(RP_DIM)
    ]


def q_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson–Lindenstrauss random projection (Achlioptas 2003 ±1
    variant) + distortion audit — the dimensionality-reduction step a
    100-TB embedding pipeline runs BEFORE LSH bucketing or index
    build (64→8 dims cuts every downstream distance fold 8×), with
    the audit that justifies it: for constructed neighbor pairs
    (vec_id, vec_id+1), the exact original squared distance, the
    projected squared distance, and the distortion ratio against the
    JL expectation E[pd2] = RP_DIM·od2 (±1 entries, unnormalized).

    Cross-engine: components floor to e4 BIGINTs (signed stable
    floor); the projection is a literal ±1 integer fold — EXACT, no
    float anywhere past the e4 floor; ratio_e5 = (pd2·1e5) DIV
    (RP_DIM·od2) truncating DIV on non-negative BIGINTs.

    Scale shape: projection is a pure per-row map; the audit pair is
    ONE co-partitioned self equi-join on vec_id+1 (the
    minhash_calibration convention); no explode, no window."""
    signs = _rp_signs()
    emb = _emb(spark, sf_dir).select(
        "vec_id",
        F.transform(
            "embedding",
            lambda x: F.floor(
                x.cast("double") * F.lit(10000.0) + F.lit(0.5)
            ).cast("long"),
        ).alias("xe"),
    )
    proj = emb.select(
        "vec_id",
        "xe",
        F.array(
            *[
                sum(
                    (
                        F.element_at("xe", i + 1)
                        if s == 1
                        else -F.element_at("xe", i + 1)
                    )
                    for i, s in enumerate(signs[j])
                ).alias(f"y{j}")
                for j in range(RP_DIM)
            ]
        ).alias("y"),
    )
    b = proj.select(
        (F.col("vec_id") - 1).alias("vec_id"),
        F.col("xe").alias("xb"),
        F.col("y").alias("yb"),
    )
    pairs = proj.join(b, "vec_id")

    def d2(ca: str, cb: str) -> F.Column:
        return F.aggregate(
            F.zip_with(
                F.col(ca), F.col(cb), lambda p, q: (p - q) * (p - q)
            ),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        )

    return pairs.select(
        "vec_id",
        d2("xe", "xb").alias("od2"),
        d2("y", "yb").alias("pd2"),
    ).select(
        "vec_id",
        "od2",
        "pd2",
        F.expr(
            f"CASE WHEN od2 = 0 THEN CAST(0 AS BIGINT) "
            f"ELSE (pd2 * 100000) DIV ({RP_DIM} * od2) END"
        ).alias("ratio_e5"),
    )


def _random_projection_sql(dim: int = KMEANS_DIM) -> str:
    """random_projection oracle: identical e4 floors, the SAME spliced
    ±1 sign literals folded in index order, vec_id+1 pairing, and the
    truncating-DIV distortion ratio."""
    signs = _rp_signs(dim)
    ys = ",\n         ".join(
        "("
        + " ".join(
            ("+ " if s == 1 else "- ") + f"xe[{i + 1}]"
            for i, s in enumerate(signs[j])
        ).lstrip("+ ")
        + f") AS y{j}"
        for j in range(RP_DIM)
    )
    pd2 = " + ".join(
        f"(a.y{j} - b.y{j}) * (a.y{j} - b.y{j})" for j in range(RP_DIM)
    )
    od2 = " + ".join(
        f"(a.xe[{i + 1}] - b.xe[{i + 1}]) * (a.xe[{i + 1}] - b.xe[{i + 1}])"
        for i in range(dim)
    )
    return f"""
WITH xe AS (
  SELECT vec_id,
         list_transform(embedding,
           x -> CAST(floor(CAST(x AS DOUBLE) * 10000 + 0.5) AS BIGINT)) AS xe
  FROM embeddings
), proj AS (
  SELECT vec_id, xe,
         {ys}
  FROM xe
), pairs AS (
  SELECT a.vec_id,
         CAST({od2} AS BIGINT) AS od2,
         CAST({pd2} AS BIGINT) AS pd2
  FROM proj a JOIN proj b ON b.vec_id = a.vec_id + 1
)
SELECT vec_id, od2, pd2,
       CASE WHEN od2 = 0 THEN CAST(0 AS BIGINT)
            ELSE CAST((pd2 * 100000) // ({RP_DIM} * od2) AS BIGINT)
       END AS ratio_e5
FROM pairs
"""


# Linear-CKA spec — MIRRORED in `_cka_sql`; change together.  X = the
# first CKA_DX e4-floored embedding coords (the random_projection
# floor), Y = the RP_DIM ±1-projection coords (the `_rp_signs`
# literals flow in — sign/salt changes move BOTH oracles).  Centered
# cross-moments are the n·M − S·T integer form in DECIMAL(38,0) ↔
# HUGEINT (exact to ~1e12 rows × e4 coords); the three Frobenius
# folds are ONE shared text helper (`_cka_frob` — the _heaps_ols_exprs
# rule) over the exact entries cast DOUBLE in (j,k) row-major order.
CKA_DX = 8


def _cka_frob(prefix: str, nj: int, nk: int) -> str:
    """Frobenius-norm-squared fold text over centered-moment columns
    {prefix}{j}_{k} — ONE helper spliced into BOTH engines (left-
    assoc + chain, so the double fold order is identical)."""
    return " + ".join(
        f"CAST({prefix}{j}_{k} AS DOUBLE) * CAST({prefix}{j}_{k} AS DOUBLE)"
        for j in range(nj)
        for k in range(nk)
    )


_CKA_FINAL = (
    "CASE WHEN f2xx > 0 AND f2yy > 0 THEN"
    " CAST(floor(f2xy / sqrt(f2xx * f2yy) * 1000000.0) AS BIGINT)"
    " ELSE CAST(0 AS BIGINT) END AS cka_e6"
)


def q_cka_alignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear CKA representation alignment (Kornblith et al. 2019,
    "Similarity of Neural Network Representations Revisited") between
    the CKA_DX-dim matryoshka prefix and the RP_DIM-dim ±1 random
    projection of the FULL embedding — the one-number audit of how
    much of the full representation's structure the cheap prefix
    already carries versus a JL sketch of everything: linear CKA =
    ‖Y'ᵀX'‖²_F / (‖X'ᵀX'‖_F · ‖Y'ᵀY'‖_F) over column-centered
    features, invariant to rotation and isotropic scaling — exactly
    why it is the standard for comparing embedding spaces.

    Cross-engine: coords are the random_projection e4 floors (exact
    BIGINT); raw moments accumulate DECIMAL(38,0) ↔ HUGEINT; each
    centered entry is the EXACT integer n·M_jk − S_j·T_k (no
    division, no mean floats — the n· multiplication keeps centering
    exact); the three Frobenius folds share ONE generated expression
    text (`_cka_frob`) and the final ÷/sqrt/floor is the bit-exact
    IEEE class.  CKA(X,X) = 1 identically — the pytest proof.

    Scale shape: pure map → ONE scalar agg (3·64+16+1 partial-agg
    columns, map-side combined) → two metadata-scale projections.
    Output is one row; nothing touches the driver."""
    dx, dy = CKA_DX, RP_DIM
    signs = _rp_signs()
    emb = _emb(spark, sf_dir).select(
        F.transform(
            "embedding",
            lambda x: F.floor(
                x.cast("double") * F.lit(10000.0) + F.lit(0.5)
            ).cast("long"),
        ).alias("xe")
    )
    feat = emb.select(
        *[F.element_at("xe", j + 1).alias(f"x{j}") for j in range(dx)],
        *[
            sum(
                (
                    F.element_at("xe", i + 1)
                    if s == 1
                    else -F.element_at("xe", i + 1)
                )
                for i, s in enumerate(signs[k])
            ).alias(f"y{k}")
            for k in range(dy)
        ],
    )
    dec = "decimal(38,0)"
    aggs = [F.count(F.lit(1)).cast("long").alias("n")]
    aggs += [
        F.sum(F.col(f"x{j}").cast(dec)).alias(f"sx{j}") for j in range(dx)
    ]
    aggs += [
        F.sum(F.col(f"y{k}").cast(dec)).alias(f"ty{k}") for k in range(dy)
    ]
    for j in range(dx):
        for k in range(dy):
            aggs.append(
                F.sum((F.col(f"x{j}") * F.col(f"y{k}")).cast(dec)).alias(
                    f"mxy{j}_{k}"
                )
            )
    for j in range(dx):
        for k in range(dx):
            aggs.append(
                F.sum((F.col(f"x{j}") * F.col(f"x{k}")).cast(dec)).alias(
                    f"mxx{j}_{k}"
                )
            )
    for j in range(dy):
        for k in range(dy):
            aggs.append(
                F.sum((F.col(f"y{j}") * F.col(f"y{k}")).cast(dec)).alias(
                    f"myy{j}_{k}"
                )
            )
    agg = feat.agg(*aggs)
    cent = agg.selectExpr(
        "n",
        *[
            f"CAST(n AS DECIMAL(38,0)) * mxy{j}_{k} - sx{j} * ty{k}"
            f" AS cxy{j}_{k}"
            for j in range(dx)
            for k in range(dy)
        ],
        *[
            f"CAST(n AS DECIMAL(38,0)) * mxx{j}_{k} - sx{j} * sx{k}"
            f" AS cxx{j}_{k}"
            for j in range(dx)
            for k in range(dx)
        ],
        *[
            f"CAST(n AS DECIMAL(38,0)) * myy{j}_{k} - ty{j} * ty{k}"
            f" AS cyy{j}_{k}"
            for j in range(dy)
            for k in range(dy)
        ],
    )
    frob = cent.selectExpr(
        "n",
        f"({_cka_frob('cxy', dx, dy)}) AS f2xy",
        f"({_cka_frob('cxx', dx, dx)}) AS f2xx",
        f"({_cka_frob('cyy', dy, dy)}) AS f2yy",
    )
    return frob.selectExpr("CAST(n AS BIGINT) AS n_vecs", _CKA_FINAL)


def _cka_sql(dx: int | None = None) -> str:
    """cka_alignment oracle: identical e4 floors and spliced ±1 sign
    folds, HUGEINT raw moments, the same n·M − S·T centered entries,
    and the SHARED `_cka_frob`/`_CKA_FINAL` texts."""
    dx = CKA_DX if dx is None else dx
    dy = RP_DIM
    signs = _rp_signs()
    ys = ",\n         ".join(
        "("
        + " ".join(
            ("+ " if s == 1 else "- ") + f"xe[{i + 1}]"
            for i, s in enumerate(signs[k])
        ).lstrip("+ ")
        + f") AS y{k}"
        for k in range(dy)
    )
    xs = ",\n         ".join(f"xe[{j + 1}] AS x{j}" for j in range(dx))
    sums = ["CAST(count(*) AS BIGINT) AS n"]
    sums += [f"sum(x{j}) AS sx{j}" for j in range(dx)]
    sums += [f"sum(y{k}) AS ty{k}" for k in range(dy)]
    sums += [
        f"sum(x{j} * y{k}) AS mxy{j}_{k}"
        for j in range(dx)
        for k in range(dy)
    ]
    sums += [
        f"sum(x{j} * x{k}) AS mxx{j}_{k}"
        for j in range(dx)
        for k in range(dx)
    ]
    sums += [
        f"sum(y{j} * y{k}) AS myy{j}_{k}"
        for j in range(dy)
        for k in range(dy)
    ]
    cents = (
        [
            f"CAST(n AS HUGEINT) * mxy{j}_{k} - sx{j} * ty{k}"
            f" AS cxy{j}_{k}"
            for j in range(dx)
            for k in range(dy)
        ]
        + [
            f"CAST(n AS HUGEINT) * mxx{j}_{k} - sx{j} * sx{k}"
            f" AS cxx{j}_{k}"
            for j in range(dx)
            for k in range(dx)
        ]
        + [
            f"CAST(n AS HUGEINT) * myy{j}_{k} - ty{j} * ty{k}"
            f" AS cyy{j}_{k}"
            for j in range(dy)
            for k in range(dy)
        ]
    )
    return f"""
WITH xe AS (
  SELECT list_transform(embedding,
           x -> CAST(floor(CAST(x AS DOUBLE) * 10000 + 0.5) AS BIGINT)) AS xe
  FROM embeddings
), feat AS (
  SELECT {xs},
         {ys}
  FROM xe
), agg AS (
  SELECT {", ".join(sums)} FROM feat
), cent AS (
  SELECT n, {", ".join(cents)} FROM agg
), frob AS (
  SELECT n,
         ({_cka_frob("cxy", dx, dy)}) AS f2xy,
         ({_cka_frob("cxx", dx, dx)}) AS f2xx,
         ({_cka_frob("cyy", dy, dy)}) AS f2yy
  FROM cent
)
SELECT CAST(n AS BIGINT) AS n_vecs, {_CKA_FINAL}
FROM frob
"""


def q_hamming_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign binarization of embeddings into 64-bit Hamming codes +
    the calibration audit — the memory-cut scale path for near-dup
    screening and coarse ANN (Charikar 2002 SimHash with coordinate
    hyperplanes: 64 dims → 8 bytes, 64× smaller than float32, and
    Hamming distance is two XOR+popcounts): per vector the two 32-bit
    code halves, and per constructed neighbor pair (vec_id, vec_id+1)
    the Hamming distance next to the exact e5 cosine — the table that
    calibrates a Hamming radius to a cosine threshold before the
    binary index replaces the float one.

    Cross-engine: bits are `emb[i] > 0` (float compare — exact); the
    code build is an integer shift fold; two 32-bit halves instead of
    one 64-bit code because bit 63 would overflow signed BIGINT;
    Hamming = bit_count(xor) per half (both engines); cosine is the
    `_cosine_cols` fold ↔ list_cosine_similarity ::DOUBLE[] with the
    signed-safe e5 floor (the knn_graph discipline).

    Scale shape: code build is a pure per-row map (this IS the
    production artifact — 8 bytes/vector); the audit pair is ONE
    co-partitioned self equi-join on vec_id+1 (the random_projection
    convention); no explode, no window."""
    emb = _emb(spark, sf_dir)

    def code(lo: int) -> F.Column:
        return F.expr(
            f"aggregate(sequence({lo}, {lo + 31}), CAST(0 AS BIGINT), "
            f"(acc, i) -> acc + CASE WHEN element_at(embedding, i) > 0 "
            f"THEN shiftleft(CAST(1 AS BIGINT), i - {lo}) "
            f"ELSE CAST(0 AS BIGINT) END)"
        )

    coded = emb.select(
        "vec_id",
        "embedding",
        code(1).alias("code_lo"),
        code(33).alias("code_hi"),
    )
    b = coded.select(
        (F.col("vec_id") - 1).alias("vec_id"),
        F.col("embedding").alias("eb"),
        F.col("code_lo").alias("blo"),
        F.col("code_hi").alias("bhi"),
    )
    pairs = coded.join(b, "vec_id")
    cos_e5 = F.floor(
        _cosine_cols(F.col("embedding"), F.col("eb")) * F.lit(100000.0)
    ).cast("long")
    return pairs.select(
        "vec_id",
        "code_lo",
        "code_hi",
        (
            F.expr("bit_count(code_lo ^ blo)")
            + F.expr("bit_count(code_hi ^ bhi)")
        )
        .cast("long")
        .alias("ham"),
        cos_e5.alias("cos_e5"),
    )


def _hamming_codes_sql() -> str:
    """hamming_codes oracle: identical shift folds per 32-bit half,
    xor+bit_count Hamming, list_cosine_similarity e5 floor."""

    def code(lo: int) -> str:
        return (
            f"CAST(list_sum(list_transform(generate_series({lo}, {lo + 31}),"
            f" i -> CASE WHEN embedding[i] > 0"
            f" THEN (CAST(1 AS BIGINT) << (i - {lo}))"
            f" ELSE CAST(0 AS BIGINT) END)) AS BIGINT)"
        )

    return f"""
WITH coded AS (
  SELECT vec_id, embedding,
         {code(1)} AS code_lo,
         {code(33)} AS code_hi
  FROM embeddings
)
SELECT a.vec_id, a.code_lo, a.code_hi,
       CAST(bit_count(xor(a.code_lo, b.code_lo))
            + bit_count(xor(a.code_hi, b.code_hi)) AS BIGINT) AS ham,
       CAST(floor(list_cosine_similarity(a.embedding::DOUBLE[],
                                         b.embedding::DOUBLE[])
                  * 100000) AS BIGINT) AS cos_e5
FROM coded a JOIN coded b ON b.vec_id = a.vec_id + 1
"""


def q_quantile_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source quantile normalization of the quality score — the
    batch-effect correction a multi-source corpus needs before ANY
    global quality threshold is meaningful (each source's scorer
    distribution differs; normalizing maps every source's CDF onto
    the pooled one, the Bolstad/microarray method applied to corpus
    curation).  Emits the bounded MAPPING TABLE — per (source,
    bucket): count, the source CDF position, and the normalized
    global bucket (smallest pooled bucket whose CDF covers it);
    applying it to docs is a broadcast map join downstream.

    Cross-engine: buckets are the exact `quality_bucket()` integers;
    CDFs are the e9 integer form (cum·1e9) DIV n — the source_ks_drift
    rule (never cum·n; the e9 form is exact to ~9·10^9 rows/source,
    the family's documented bound); the crossing lookup is min pooled
    bucket with gcdf_e9 ≥ cdf_e9 — Spark computes it as a pure map
    over the DRIVER-COLLECTED pooled histogram literals (bounded
    ≤1001 rows — the quality_gate_thresholds precedent), DuckDB as
    the equivalent correlated min.

    Scale shape: two bounded histogram hash aggs (sources×≤1001 and
    ≤1001 rows); windows run over the histogram, never over docs; the
    mapping application is join-free here and a broadcast join in a
    consumer."""
    from pyspark.sql.window import Window

    qd = _docs(spark, sf_dir).select(
        "source", quality_score().alias("quality")
    ).select("source", quality_bucket().alias("qb"))
    h = qd.groupBy("source", "qb").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    grows = sorted(
        (r["qb"], r["gn"])
        for r in qd.groupBy("qb")
        .agg(F.count(F.lit(1)).cast("long").alias("gn"))
        .collect()
    )
    n_total = sum(gn for _, gn in grows)
    cum = 0
    gbuckets, gcdfs = [], []
    for qb, gn in grows:
        cum += gn
        gbuckets.append(int(qb))
        gcdfs.append(cum * 1_000_000_000 // n_total)
    garr = F.array(*[F.lit(x) for x in gcdfs])
    gbk = F.array(*[F.lit(x) for x in gbuckets])

    ws = Window.partitionBy("source").orderBy("qb")
    wsrc = Window.partitionBy("source")
    scum = h.select(
        "source",
        "qb",
        "n",
        F.sum("n").over(ws).cast("long").alias("cum"),
        F.sum("n").over(wsrc).cast("long").alias("nsrc"),
    ).withColumn("cdf_e9", F.expr("(cum * 1000000000) DIV nsrc"))
    idx = F.size(F.filter(garr, lambda x: x < F.col("cdf_e9")))
    return scum.select(
        "source",
        F.col("qb").alias("bucket"),
        F.col("n").alias("n_docs"),
        "cdf_e9",
        F.element_at(gbk, idx + 1).cast("long").alias("norm_bucket"),
    )


# Best-of-n constants — MIRRORED in `_best_of_n_sql`; change
# together.  The grid must stay ≤ BON_MAX and the sample order is the
# knuth (h, doc_id) rule shared with scorer_agreement/preference_pairs.
BON_GRID = (1, 2, 4, 8, 16, 32)
BON_MAX = 32


def q_best_of_n(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Best-of-n selection curve (the rejection-sampling / BoN
    statistic of RLHF and inference-scaling work): per source, the
    quality of the best candidate among the first n knuth-sampled
    docs, for n over a doubling grid — the curve that tells a
    pipeline how much an extra sample buys (E[max of n] flattens
    where quality saturates).  Emits (source, n, n_eff, bon_q_e5).

    Cross-engine: quality is the stable e5 BIGINT numerator; the
    sample order is the deterministic knuth (h, doc_id) rule; each
    grid point is a conditional max over the bounded sample — all
    BIGINT, no float anywhere.

    Scale shape: ONE source-partitioned rank window over the
    ≤BON_MAX-per-source sample (few-fat-partitions), then ONE
    sources-scale agg with a conditional max per grid point, unpivoted
    to rows via a per-row explode — no second shuffle."""
    from pyspark.sql.window import Window

    qnum = F.floor(quality_score() * F.lit(100000.0) + F.lit(0.5)).cast(
        "long"
    )
    uni = _docs(spark, sf_dir).select(
        "source",
        "doc_id",
        qnum.alias("q_e5"),
        knuth_hash(F.col("doc_id")).alias("h"),
    )
    ws = Window.partitionBy("source").orderBy("h", "doc_id")
    keep = uni.withColumn("srk", F.row_number().over(ws)).where(
        F.col("srk") <= BON_MAX
    )
    aggs = []
    for n in BON_GRID:
        aggs.append(
            F.max(F.when(F.col("srk") <= n, F.col("q_e5")))
            .cast("long")
            .alias(f"bon_{n}")
        )
        aggs.append(
            F.sum(F.when(F.col("srk") <= n, 1).otherwise(0))
            .cast("long")
            .alias(f"c_{n}")
        )
    wide = keep.groupBy("source").agg(*aggs)
    rows = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(n).cast("long").alias("n"),
                    F.col(f"c_{n}").alias("n_eff"),
                    F.col(f"bon_{n}").alias("bon_q_e5"),
                )
                for n in BON_GRID
            ]
        )
    ).alias("r")
    return wide.select("source", rows).select(
        "source", "r.n", "r.n_eff", "r.bon_q_e5"
    )


def _best_of_n_sql() -> str:
    """best_of_n oracle: the same knuth sample, conditional maxes per
    grid point, unpivoted via UNION ALL."""
    base = _TEXT_CTE + f"""
, qq AS (
  SELECT doc_id, CAST(floor(({_QUALITY_SQL}) * 100000 + 0.5) AS BIGINT) AS q_e5
  FROM feats
), uni AS (
  SELECT d.source, q.doc_id, q.q_e5,
         ((d.doc_id % {KNUTH_P}) * {KNUTH_A}) % {KNUTH_P} AS h
  FROM qq q JOIN (SELECT doc_id, source FROM documents) d
    ON q.doc_id = d.doc_id
), keep AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY source ORDER BY h, doc_id) AS srk
    FROM uni
  ) WHERE srk <= {BON_MAX}
), wide AS (
  SELECT source,
"""
    cols = ",\n".join(
        f"    CAST(max(CASE WHEN srk <= {n} THEN q_e5 END) AS BIGINT)"
        f" AS bon_{n},\n"
        f"    CAST(sum(CASE WHEN srk <= {n} THEN 1 ELSE 0 END) AS BIGINT)"
        f" AS c_{n}"
        for n in BON_GRID
    )
    unions = "\nUNION ALL\n".join(
        f"SELECT source, CAST({n} AS BIGINT) AS n, c_{n} AS n_eff,"
        f" bon_{n} AS bon_q_e5 FROM wide"
        for n in BON_GRID
    )
    return base + cols + "\n  FROM keep GROUP BY 1\n)\n" + unions


def _quantile_normalize_sql() -> str:
    """quantile_normalize oracle: the same bucket/e9-CDF chain with
    the crossing as a correlated min over the pooled histogram."""
    return _TEXT_CTE + f"""
, qd AS (
  SELECT d.source,
         CAST(floor(({_QUALITY_SQL}) * 100000 + 0.5) AS BIGINT) // 100 AS qb
  FROM feats f JOIN (SELECT doc_id, source FROM documents) d
    ON f.doc_id = d.doc_id
), h AS (
  SELECT source, qb, CAST(count(*) AS BIGINT) AS n FROM qd GROUP BY 1, 2
), sc AS (
  SELECT source, qb, n,
         CAST((CAST(sum(n) OVER (PARTITION BY source ORDER BY qb) AS BIGINT)
               * 1000000000)
              // CAST(sum(n) OVER (PARTITION BY source) AS BIGINT)
              AS BIGINT) AS cdf_e9
  FROM h
), g AS (
  SELECT qb, CAST(count(*) AS BIGINT) AS gn FROM qd GROUP BY 1
), gcdf AS (
  SELECT qb,
         CAST((CAST(sum(gn) OVER (ORDER BY qb) AS BIGINT) * 1000000000)
              // CAST(sum(gn) OVER () AS BIGINT) AS BIGINT) AS gcdf_e9
  FROM g
)
SELECT source, qb AS bucket, n AS n_docs, cdf_e9,
  CAST((SELECT min(g2.qb) FROM gcdf g2 WHERE g2.gcdf_e9 >= sc.cdf_e9)
       AS BIGINT) AS norm_bucket
FROM sc
"""


# T5 span-corruption constants — MIRRORED in `_span_corrupt_sql`;
# change together.  Two spans, one per document HALF (so span order
# and non-overlap hold by construction); span length
# 1 + knuth(2·doc_id + k) % SC_MAX_LEN clamped to the half; offset
# knuth(5·doc_id + k) % (free slots).  Docs under SC_MIN_TOKENS pass
# through untransformed (sc = 0).
SC_SPANS = 2
SC_MAX_LEN = 3
SC_MIN_TOKENS = 8
SC_SENTINELS = ("<extra_id_0>", "<extra_id_1>", "<extra_id_2>")


def q_span_corrupt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5-style span corruption (Raffel et al., JMLR 2020 §3.1.4) —
    the OTHER canonical denoising training transform next to
    `fim_transform`'s PSM reordering: mask two hash-derived token
    spans with sentinels and emit (input = text with sentinels,
    target = sentinel-delimited masked spans).  Together the two
    transforms cover the seq2seq-denoising and infilling families a
    training-data pipeline materializes.

    Cross-engine: spans live in opposite document halves (the half
    boundary is n DIV 2), so s1 ≤ e1 < s2 ≤ e2 always and no overlap
    rule is needed; lengths/offsets are pure knuth-integer functions
    of doc_id; both engines build input/target as ONE concatenated
    token array then space-join it (the fim_transform rule — nested
    concat_ws double-spaces on empty slices).  Outputs ship as md5s
    plus exact BIGINT counts.

    Scale shape: pure per-row Catalyst map — zero exchanges, no
    explode (slice/concat/md5 on the token array)."""
    docs = (
        _docs(spark, sf_dir)
        .select("doc_id", "text")
        .where(F.trim("text") != "")
    )
    t = F.col("t")
    n = F.size(t)
    base = docs.select("doc_id", _lm_tokens().alias("t")).select(
        "doc_id", "t", n.alias("n")
    )
    half = F.expr("n DIV 2")
    spans = []
    for k in range(SC_SPANS):
        seg_start = F.when(F.lit(k) == 0, F.lit(1)).otherwise(half + 1)
        seg_len = F.when(F.lit(k) == 0, half).otherwise(F.col("n") - half)
        ln = F.least(
            F.lit(1)
            + (knuth_hash(F.col("doc_id") * 2 + F.lit(k)) % SC_MAX_LEN)
            .cast("int"),
            seg_len.cast("int"),
        )
        off = (
            knuth_hash(F.col("doc_id") * 5 + F.lit(k))
            % (seg_len.cast("long") - ln.cast("long") + 1)
        ).cast("int")
        s = (seg_start.cast("int") + off).alias(f"s{k}")
        spans.append((s, (F.col(f"s{k}") + F.col(f"l{k}") - 1), ln))
    withc = base.select(
        "doc_id",
        "t",
        "n",
        spans[0][0],
        spans[0][2].alias("l0"),
        spans[1][0],
        spans[1][2].alias("l1"),
    ).select(
        "doc_id",
        "t",
        "n",
        "s0",
        "l0",
        (F.col("s0") + F.col("l0") - 1).alias("e0"),
        "s1",
        "l1",
        (F.col("s1") + F.col("l1") - 1).alias("e1"),
    )
    sc = (F.col("n") >= SC_MIN_TOKENS).cast("long")
    s0, e0, s1, e1 = (F.col(c) for c in ("s0", "e0", "s1", "e1"))
    inp_arr = F.concat(
        F.slice(t, 1, s0 - 1),
        F.array(F.lit(SC_SENTINELS[0])),
        F.slice(t, e0 + 1, s1 - e0 - 1),
        F.array(F.lit(SC_SENTINELS[1])),
        F.slice(t, e1 + 1, F.col("n") - e1),
    )
    tgt_arr = F.concat(
        F.array(F.lit(SC_SENTINELS[0])),
        F.slice(t, s0, F.col("l0")),
        F.array(F.lit(SC_SENTINELS[1])),
        F.slice(t, s1, F.col("l1")),
        F.array(F.lit(SC_SENTINELS[2])),
    )
    return withc.select(
        "doc_id",
        sc.alias("sc"),
        F.col("n").cast("long").alias("n"),
        F.when(sc == 1, (F.col("l0") + F.col("l1")).cast("long"))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("n_masked"),
        F.md5(
            F.when(sc == 1, F.concat_ws(" ", inp_arr)).otherwise(
                F.concat_ws(" ", t)
            )
        ).alias("input_md5"),
        F.md5(
            F.when(sc == 1, F.concat_ws(" ", tgt_arr)).otherwise(F.lit(""))
        ).alias("target_md5"),
    )


def _span_corrupt_sql() -> str:
    """span_corrupt oracle: identical knuth span derivation per half,
    single concatenated-list builds, md5 of the space-join."""
    kh = lambda expr: f"((({expr}) % {KNUTH_P}) * {KNUTH_A}) % {KNUTH_P}"  # noqa: E731
    return f"""
WITH toks AS (
  SELECT doc_id,
         regexp_split_to_array(trim(lower(text)),
                               '[ \\t\\n\\x0B\\f\\r]+') AS t
  FROM documents WHERE trim(text) <> ''
), base AS (
  SELECT doc_id, t, len(t) AS n FROM toks
), cuts AS (
  SELECT doc_id, t, n,
    least(1 + ({kh('doc_id * 2 + 0')}) % {SC_MAX_LEN}, n // 2) AS l0,
    least(1 + ({kh('doc_id * 2 + 1')}) % {SC_MAX_LEN}, n - n // 2) AS l1,
    1 + ({kh('doc_id * 5 + 0')})
        % (n // 2 - least(1 + ({kh('doc_id * 2 + 0')}) % {SC_MAX_LEN},
                          n // 2) + 1) AS s0,
    n // 2 + 1 + ({kh('doc_id * 5 + 1')})
        % ((n - n // 2)
           - least(1 + ({kh('doc_id * 2 + 1')}) % {SC_MAX_LEN},
                   n - n // 2) + 1) AS s1
  FROM base
), marked AS (
  SELECT doc_id, t, n, l0, l1, s0, s1,
         s0 + l0 - 1 AS e0, s1 + l1 - 1 AS e1,
         CASE WHEN n >= {SC_MIN_TOKENS} THEN 1 ELSE 0 END AS sc
  FROM cuts
)
SELECT doc_id, CAST(sc AS BIGINT) AS sc, CAST(n AS BIGINT) AS n,
  CAST(CASE WHEN sc = 1 THEN l0 + l1 ELSE 0 END AS BIGINT) AS n_masked,
  md5(CASE WHEN sc = 1 THEN
        array_to_string(
          t[1:s0-1] || ['{SC_SENTINELS[0]}'] || t[e0+1:s1-1]
          || ['{SC_SENTINELS[1]}'] || t[e1+1:n], ' ')
      ELSE array_to_string(t, ' ') END) AS input_md5,
  md5(CASE WHEN sc = 1 THEN
        array_to_string(
          ['{SC_SENTINELS[0]}'] || t[s0:e0] || ['{SC_SENTINELS[1]}']
          || t[s1:e1] || ['{SC_SENTINELS[2]}'], ' ')
      ELSE '' END) AS target_md5
FROM marked
"""


def q_fim_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fill-in-the-middle training transform (Bavarian et al. 2022,
    "Efficient Training of Language Models to Fill in the Middle"):
    for a deterministic ``FIM_RATE``-permille slice of docs, split the
    token stream at two hash-derived cut points and emit the PSM
    reordering ``<PRE> prefix <SUF> suffix <MID> middle`` — the
    document-level transform code-LM pipelines apply so the model
    learns infilling; the rest pass through untransformed.  Emits the
    md5 of the (token-joined) output text plus the exact split sizes,
    so the driver value-hashes the full string surgery.

    Cross-engine: the gate is the knuth permille (the holdout rule);
    cut points are knuth_hash(doc_id) % (n-1) and
    knuth_hash(2*doc_id + 1) % (n-1) mapped to 1-based interior cuts
    lo < hi (equal draws widen by one — every branch integer); token
    slicing and the space-join are pure string ops both engines run
    identically.  Docs with n < 3 tokens are never split (no interior
    pair exists) and pass through with fim = 0.

    Scale shape: a pure per-row map — zero exchanges, no UDF; the
    output text column is written where a real pipeline writes it,
    and the md5 keeps the oracle compare row-sized."""
    docs = (
        _docs(spark, sf_dir)
        .select("doc_id", "text")
        .where(F.trim("text") != "")
    )
    t = docs.select("doc_id", _lm_tokens().alias("t")).withColumn(
        "n", F.size("t").cast("long")
    )
    pm = knuth_hash(F.col("doc_id")) % 1000
    c1 = knuth_hash(F.col("doc_id")) % (F.col("n") - 1)
    c2 = knuth_hash(F.lit(2) * F.col("doc_id") + 1) % (F.col("n") - 1)
    lo0 = F.least(c1, c2) + 1
    hi0 = F.greatest(c1, c2) + 1
    hi = F.when(hi0 == lo0, hi0 + 1).otherwise(hi0)
    gated = t.withColumn(
        "fim",
        ((pm < FIM_RATE) & (F.col("n") >= 3)).cast("long"),
    ).withColumn(
        "lo", F.when(F.col("fim") == 1, lo0).otherwise(F.lit(0))
    ).withColumn(
        "hi", F.when(F.col("fim") == 1, hi).otherwise(F.lit(0))
    )
    pre = F.slice("t", F.lit(1), F.col("lo").cast("int"))
    mid = F.expr("slice(t, CAST(lo + 1 AS INT), CAST(hi - lo AS INT))")
    suf = F.expr("slice(t, CAST(hi + 1 AS INT), CAST(n - hi AS INT))")
    out_text = F.when(
        F.col("fim") == 1,
        F.concat_ws(
            " ",
            F.concat(
                F.array(F.lit(FIM_PRE)),
                pre,
                F.array(F.lit(FIM_SUF)),
                suf,
                F.array(F.lit(FIM_MID)),
                mid,
            ),
        ),
    ).otherwise(F.concat_ws(" ", F.col("t")))
    return gated.select(
        "doc_id",
        "fim",
        F.when(F.col("fim") == 1, F.col("lo")).otherwise(F.lit(0))
        .cast("long")
        .alias("n_pre"),
        F.when(F.col("fim") == 1, F.col("hi") - F.col("lo"))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("n_mid"),
        F.when(F.col("fim") == 1, F.col("n") - F.col("hi"))
        .otherwise(F.col("n"))
        .cast("long")
        .alias("n_suf"),
        F.md5(out_text).alias("out_md5"),
    )


def _fim_sql() -> str:
    """fim_transform oracle: identical permille gate, knuth cut
    points, 1-based interior cuts with the equal-draw widen rule, and
    the same PSM space-join."""
    kh = f"(((doc_id % {KNUTH_P}) * {KNUTH_A}) % {KNUTH_P})"
    kh2 = (
        f"((((2 * doc_id + 1) % {KNUTH_P}) * {KNUTH_A}) % {KNUTH_P})"
    )
    return f"""
WITH toks AS (
  SELECT doc_id,
         regexp_split_to_array(trim(lower(text)), '[ \\t\\n\\x0B\\f\\r]+') AS t
  FROM documents WHERE trim(text) <> ''
), base AS (
  SELECT doc_id, t, CAST(len(t) AS BIGINT) AS n,
         CASE WHEN {kh} % 1000 < {FIM_RATE} AND len(t) >= 3
              THEN 1 ELSE 0 END AS fim,
         {kh} % (len(t) - 1) AS c1,
         {kh2} % (len(t) - 1) AS c2
  FROM toks
), cuts AS (
  SELECT doc_id, t, n, fim,
         least(c1, c2) + 1 AS lo0,
         CASE WHEN greatest(c1, c2) = least(c1, c2)
              THEN greatest(c1, c2) + 2
              ELSE greatest(c1, c2) + 1 END AS hi
  FROM base
)
SELECT doc_id, CAST(fim AS BIGINT) AS fim,
  CAST(CASE WHEN fim = 1 THEN lo0 ELSE 0 END AS BIGINT) AS n_pre,
  CAST(CASE WHEN fim = 1 THEN hi - lo0 ELSE 0 END AS BIGINT) AS n_mid,
  CAST(CASE WHEN fim = 1 THEN n - hi ELSE n END AS BIGINT) AS n_suf,
  md5(CASE WHEN fim = 1 THEN
        array_to_string(
          ['{FIM_PRE}'] || t[1:lo0] || ['{FIM_SUF}'] || t[hi+1:n]
          || ['{FIM_MID}'] || t[lo0+1:hi], ' ')
      ELSE array_to_string(t, ' ') END) AS out_md5
FROM cuts
"""


# Heaps-law checkpoint grid (knuth-hash permille prefixes) — MIRRORED
# in the `heaps_law` oracle SQL; change together.  The prefix rule is
# the holdout_split permille convention, so prefixes are stable under
# re-runs and incremental growth.
HEAPS_GRID = (125, 250, 375, 500, 625, 750, 875, 1000)


def _heaps_ols_exprs(col_n: str, col_v: str) -> dict[str, str]:
    """The unrolled e3-floored-log integer-OLS sum expressions over the
    HEAPS_GRID checkpoints — identical SQL text on both engines (the
    zipf_alpha discipline: ln → e3 floor → exact BIGINT sums)."""
    tk, tsx, tsy, tsxy, tsxx = [], [], [], [], []
    for g in HEAPS_GRID:
        ok = f"({col_n}{g} > 0 AND {col_v}{g} > 0)"
        x = f"CAST(floor(ln(CAST({col_n}{g} AS DOUBLE)) * 1000.0) AS BIGINT)"
        y = f"CAST(floor(ln(CAST({col_v}{g} AS DOUBLE)) * 1000.0) AS BIGINT)"
        tk.append(f"(CASE WHEN {ok} THEN 1 ELSE 0 END)")
        tsx.append(f"(CASE WHEN {ok} THEN {x} ELSE 0 END)")
        tsy.append(f"(CASE WHEN {ok} THEN {y} ELSE 0 END)")
        tsxy.append(f"(CASE WHEN {ok} THEN {x} * {y} ELSE 0 END)")
        tsxx.append(f"(CASE WHEN {ok} THEN {x} * {x} ELSE 0 END)")
    return {
        "k": " + ".join(tk),
        "sx": " + ".join(tsx),
        "sy": " + ".join(tsy),
        "sxy": " + ".join(tsxy),
        "sxx": " + ".join(tsxx),
    }


def q_heaps_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source Heaps-law fit — the vocabulary-growth twin of
    `zipf_alpha`: V(N) ≈ K·N^β over nested corpus prefixes, β from
    the OLS slope of ln(V) vs ln(N) at the ``HEAPS_GRID`` permille
    checkpoints.  Natural text sits near β ≈ 0.5-0.8; β → 1 means
    unbounded novel types (OCR noise, random ids), β → 0 means a
    closed template vocabulary — both fail source review, and β is
    what a tokenizer-sizing plan extrapolates vocabulary from.

    Prefixes are knuth-hash permille sets (the holdout_split rule):
    stable under re-runs and incremental growth, and random-order
    growth curves are the smooth ones Heaps fitting wants.  V at
    checkpoint g counts the types whose FIRST occurrence (min pm over
    the type's docs) lands before g — exactly |vocab(prefix_g)|
    because prefixes are nested.

    Cross-engine: counts/sums are exact BIGINTs; the fit is the
    zipf_alpha e3-floored-log integer OLS (identical unrolled SQL
    text on both engines via `_heaps_ols_exprs`); beta_e6 is a SIGNED
    truncating DIV (Spark DIV == DuckDB //).

    Scale shape: ONE (source, token) hash agg (the zipf shuffle) into
    a per-source min, then TWO bounded per-source aggs with
    |HEAPS_GRID| conditional counters each — no explode of the grid
    over data rows, no window; the OLS is a pure map on
    #sources rows."""
    docs = (
        _docs(spark, sf_dir)
        .select("source", "doc_id", "text")
        .where(F.trim("text") != "")
    )
    base = docs.select(
        "source",
        (knuth_hash(F.col("doc_id")) % 1000).alias("pm"),
        _lm_tokens().alias("t"),
    )
    nrow = (
        base.select(
            "source", "pm", F.size("t").cast("long").alias("n")
        )
        .groupBy("source")
        .agg(
            *[
                F.sum(
                    F.when(F.col("pm") < g, F.col("n")).otherwise(F.lit(0))
                )
                .cast("long")
                .alias(f"n{g}")
                for g in HEAPS_GRID
            ]
        )
    )
    vrow = (
        base.select("source", "pm", F.explode("t").alias("tok"))
        .groupBy("source", "tok")
        .agg(F.min("pm").alias("mpm"))
        .groupBy("source")
        .agg(
            *[
                F.sum(F.when(F.col("mpm") < g, 1).otherwise(0))
                .cast("long")
                .alias(f"v{g}")
                for g in HEAPS_GRID
            ]
        )
    )
    ols = _heaps_ols_exprs("n", "v")
    sums = nrow.join(vrow, "source").select(
        "source",
        F.col(f"n{HEAPS_GRID[-1]}").alias("n_full"),
        F.col(f"v{HEAPS_GRID[-1]}").alias("v_full"),
        F.expr(ols["k"]).cast("long").alias("k"),
        F.expr(ols["sx"]).cast("long").alias("sx"),
        F.expr(ols["sy"]).cast("long").alias("sy"),
        F.expr(ols["sxy"]).cast("long").alias("sxy"),
        F.expr(ols["sxx"]).cast("long").alias("sxx"),
    )
    return sums.select(
        "source",
        "k",
        "n_full",
        "v_full",
        F.expr(
            "CASE WHEN (k * sxx - sx * sx) <> 0 THEN"
            " ((k * sxy - sx * sy) * 1000000) DIV (k * sxx - sx * sx)"
            " ELSE 0 END"
        ).alias("beta_e6"),
    )


def _heaps_sql() -> str:
    """heaps_law oracle: identical permille prefixes, conditional
    BIGINT counters per checkpoint, and the same unrolled OLS text."""
    kh = f"(((doc_id % {KNUTH_P}) * {KNUTH_A}) % {KNUTH_P}) % 1000"
    n_cols = ", ".join(
        f"CAST(sum(CASE WHEN pm < {g} THEN len(t) ELSE 0 END) AS BIGINT)"
        f" AS n{g}"
        for g in HEAPS_GRID
    )
    v_cols = ", ".join(
        f"CAST(sum(CASE WHEN mpm < {g} THEN 1 ELSE 0 END) AS BIGINT)"
        f" AS v{g}"
        for g in HEAPS_GRID
    )
    ols = _heaps_ols_exprs("n", "v")
    return f"""
WITH toks AS (
  SELECT source, {kh} AS pm,
         regexp_split_to_array(trim(lower(text)), '[ \\t\\n\\x0B\\f\\r]+') AS t
  FROM documents WHERE trim(text) <> ''
), n AS (
  SELECT source, {n_cols} FROM toks GROUP BY 1
), tokmin AS (
  SELECT source, tok, min(pm) AS mpm
  FROM (SELECT source, pm, unnest(t) AS tok FROM toks) GROUP BY 1, 2
), v AS (
  SELECT source, {v_cols} FROM tokmin GROUP BY 1
), sums AS (
  SELECT source, n1000 AS n_full, v1000 AS v_full,
         CAST({ols["k"]} AS BIGINT) AS k,
         CAST({ols["sx"]} AS BIGINT) AS sx,
         CAST({ols["sy"]} AS BIGINT) AS sy,
         CAST({ols["sxy"]} AS BIGINT) AS sxy,
         CAST({ols["sxx"]} AS BIGINT) AS sxx
  FROM n JOIN v USING (source)
)
SELECT source, k, n_full, v_full,
       CASE WHEN (k * sxx - sx * sx) <> 0 THEN
         ((k * sxy - sx * sy) * 1000000) // (k * sxx - sx * sx)
       ELSE 0 END AS beta_e6
FROM sums
"""


# Varint postings spec — MIRRORED in the `postings_size` oracle SQL;
# change together.  Gap convention: first posting stores doc_id itself
# (gap = doc_id), later postings store doc_id − prev; LEB128 byte count
# via an integer compare ladder (never float log — exact at any id).
def _varint_bytes(col: F.Column) -> F.Column:
    return (
        F.when(col < 128, 1)
        .when(col < 16384, 2)
        .when(col < 2097152, 3)
        .when(col < 268435456, 4)
        .when(col < 34359738368, 5)
        .when(col < 4398046511104, 6)
        .when(col < 562949953421312, 7)
        .when(col < 72057594037927936, 8)
        .otherwise(9)
        .cast("long")
    )


def q_postings_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index-compression accounting over the `inverted_index` postings:
    per term, the delta+LEB128-varint encoded size a real posting list
    costs on disk vs the raw fixed-width size — the sizing audit run
    BEFORE committing an index layout at corpus scale (the analog of
    `bloom_dedup`'s sizing audit for the retrieval side).  All exact
    BIGINTs: gaps from a lag window ordered by doc_id, byte counts from
    an integer compare ladder (see _varint_bytes note).

    Scale shape: the postings build is the proven `inverted_index`
    plan (vocab literal IN + one hash agg); the delta pass is ONE
    window per (term) — top-K terms only, each partition a single
    term's postings, exactly how a real index writer streams them."""
    from pyspark.sql.window import Window

    docs = (
        _docs(spark, sf_dir)
        .select("doc_id", "text")
        .where(F.trim("text") != "")
    )
    toks = _lm_tokens()
    top = [
        r["tok"]
        for r in docs.select(F.explode(toks).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), "tok")
        .limit(IDX_TOPK)
        .collect()
    ]
    postings = (
        docs.select("doc_id", F.explode(toks).alias("term"))
        .where(F.col("term").isin(top))
        .select("term", "doc_id")
        .distinct()
    )
    w = Window.partitionBy("term").orderBy("doc_id")
    gaps = postings.select(
        "term",
        (
            F.col("doc_id")
            - F.coalesce(F.lag("doc_id", 1).over(w), F.lit(0))
        ).alias("gap"),
    )
    return gaps.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        (F.count(F.lit(1)) * 8).cast("long").alias("raw_bytes"),
        F.sum(_varint_bytes(F.col("gap"))).cast("long").alias("varint_bytes"),
    )


# Head-shingle width for the cross-source overlap matrix — MIRRORED in
# the `source_overlap` oracle SQL; change together.  Head-of-document
# (first OVERLAP_W tokens) rather than all shingles: it catches the
# mirrored-page/syndicated-content class a cross-crawl audit hunts for,
# and keeps the per-key source set bounded without a hot-shingle cap.
OVERLAP_W = 8


def q_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source duplication matrix — for every source pair, how
    many distinct document HEADS (first ``OVERLAP_W`` whitespace
    tokens, lowercased) they share.  The audit a pipeline ingesting
    multiple crawls/mirrors runs before mixing them: a hot pair means
    one source is (partially) a mirror of the other and double-counts
    its content in the training mix.

    Scale shape: ONE distinct pass over (source, head) — corpus-scale
    hash agg; the pair join is an equi-join ON the head key whose
    per-key multiplicity is bounded by #sources (heads are distinct
    per source), so the join output is ≤ |heads|·sources²  and the
    final agg is a sources² frame — no all-pairs doc join anywhere."""
    heads = (
        _docs(spark, sf_dir)
        .where(F.trim("text") != "")
        .select(
            "source",
            F.concat_ws(
                " ", F.slice(_lm_tokens(), 1, OVERLAP_W)
            ).alias("head"),
        )
        .distinct()
    )
    a = heads.select(F.col("source").alias("source_a"), "head")
    b = heads.select(F.col("source").alias("source_b"), "head")
    return (
        a.join(b, "head")
        .where(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared_heads"))
    )


def q_doc_rarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document IDF rarity score — the boilerplate-downweighting
    signal (SoftDedup-family, Xia et al. 2024: common text contributes
    less) complementary to DSIR (which scores toward a TARGET
    distribution; rarity scores against the corpus itself): the mean
    inverse-document-frequency of the doc's token INSTANCES.  A doc of
    ubiquitous tokens scores ~0; one full of corpus-rare tokens scores
    high.  idf_e3 = floor(ln(N / df) * 1000) per instance (e3-floored
    ln — the zipf/source_kl discipline), rarity_e3 = sum DIV count,
    all BIGINT past the floor.

    Scale shape: one explode + hash agg for the df table (token →
    distinct-doc count, via per-doc array_distinct so the agg is a
    plain count), then a corpus-scale equi-join of token instances ON
    the token key — Spark co-partitions both sides; no broadcast
    needed and no driver-side vocab.  N (corpus doc count) is the only
    driver scalar."""
    docs = (
        _docs(spark, sf_dir)
        .where(F.trim("text") != "")
        .select("doc_id", _lm_tokens().alias("t"))
    )
    n_docs = docs.count()
    df_tbl = (
        docs.select(F.explode(F.array_distinct("t")).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("long").alias("df"))
    )
    inst = docs.select("doc_id", F.explode("t").alias("tok"))
    idf_e3 = F.floor(
        F.log(F.lit(float(n_docs)) / F.col("df").cast("double")) * 1000.0
    ).cast("long")
    return (
        inst.join(df_tbl, "tok")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_toks"),
            F.sum(idf_e3).cast("long").alias("sum_idf_e3"),
        )
        .withColumn("rarity_e3", F.expr("sum_idf_e3 DIV n_toks"))
    )


# Kneser–Ney discount d = KN_D_NUM/KN_D_DEN = 3/4 — MIRRORED in the
# `kn_bigram_score` oracle SQL; change together.  The probability is
# kept as ONE explicitly-ordered float expression
#   (CAST(greatest(4·c12 − 3, 0) AS DOUBLE) · B + 3.0·N1post·N1pre)
#     / (4.0 · c1 · B)
# — multiplying through by 4·c1·B avoids fraction addition; every
# product/quotient is an IEEE-correctly-rounded op over identical
# operands in the identical order on both engines, so the double (and
# its e3-floored ln) matches exactly.  Int products of two
# corpus-scale counts (c12·B ~ 10^25) would overflow BIGINT, which is
# why the numerator casts to DOUBLE before multiplying by B.
KN_D_NUM = 3
KN_D_DEN = 4


def q_kn_bigram_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser–Ney bigram scoring (Kneser & Ney 1995; the
    smoothing production n-gram LMs actually ship):
      P(w2|w1) = max(c12 − d, 0)/c1 + d·N1+(w1,·)/c1 · N1+(·,w2)/B
    with d = 3/4 — the CONTINUATION-count backoff that makes "san
    francisco"-style collocations score right where raw-frequency
    backoff fails.  Unlike `bigram_lm_score` (top-K literal vocab, OOV
    dropped), this scores EVERY bigram: the model is the full corpus
    table and smoothing guarantees P > 0 whenever w1 has a successor
    and w2 a predecessor — both true by construction for in-corpus
    pairs, so there is no OOV class at all.

    Scale shape: the c12/c1/N1post/N1pre tables are hash aggs over the
    bigram TYPE table (vocab²-bounded, far below the instance count);
    per-type lp_e3 is computed once per TYPE with two equi-joins on
    w1/w2, and instances join the scored type table ON the bigram key
    — all distributed equi-joins that co-partition, no driver-side
    vocab, no broadcast needed.  B is the one driver scalar."""
    docs = (
        _docs(spark, sf_dir)
        .where(F.trim("text") != "")
        .select("doc_id", F.col("text"))
    )
    inst = docs.select("doc_id", F.explode(_bigrams()).alias("bg"))
    sp = (
        inst.groupBy("bg")
        .agg(F.count(F.lit(1)).cast("long").alias("c12"))
        .withColumn("w1", F.substring_index("bg", " ", 1))
        .withColumn("w2", F.substring_index("bg", " ", -1))
    )
    c1 = sp.groupBy("w1").agg(
        F.sum("c12").cast("long").alias("c1"),
        F.count(F.lit(1)).cast("long").alias("n1post"),
    )
    pre = sp.groupBy("w2").agg(
        F.count(F.lit(1)).cast("long").alias("n1pre")
    )
    n_types = sp.count()
    b = F.lit(float(n_types))
    num = (
        F.greatest(4 * F.col("c12") - 3, F.lit(0)).cast("double") * b
        + F.lit(3.0) * F.col("n1post") * F.col("n1pre")
    )
    den = F.lit(4.0) * F.col("c1") * b
    typ = (
        sp.join(c1, "w1")
        .join(pre, "w2")
        .select(
            "bg",
            F.floor(F.log(num / den) * 1000.0).cast("long").alias("lp_e3"),
        )
    )
    scored = (
        inst.join(typ, "bg")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.sum("lp_e3").cast("long").alias("sum_lp_e3"),
        )
    )
    return (
        docs.select("doc_id")
        .join(scored, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_pairs", F.lit(0)).cast("long").alias("n_pairs"),
            "sum_lp_e3",
            F.expr("sum_lp_e3 DIV n_pairs").alias("avg_lp_e3"),
        )
    )


# Minhash-calibration spec — MIRRORED in the `minhash_calibration`
# oracle SQL; change together.  CAL_PERMS permutation hashes
#   h_k(x) = (((x + k·CAL_STEP) % P) · A) % P,   x = first 13 md5 hex
# chars as BIGINT (the bloom_dedup key pairing: Spark conv(_,16,10)
# == DuckDB '0x'||_ cast; 52 bits so x + 15·CAL_STEP < 2^53 and the
# knuth product stays under 2^63).  Pair classes per probe doc d
# (d % CAL_EVERY == 0, partner d+1 present): 'near' = d vs d+' extra!',
# 'half' = d vs first-half(d) ++ last-half(d+1), 'far' = d vs d+1.
CAL_PERMS = 16
CAL_STEP = 1000003
CAL_EVERY = 5

# Shared shingle expression over a token-array column named `{t}`:
# 3-token shingles, whole-text fallback for short docs — the
# dedup_minhash_lsh convention.
_SHINGLES_EXPR = (
    "CASE WHEN size({t}) >= 3 THEN transform(sequence(0, size({t}) - 3),"
    " i -> concat({t}[i], ' ', {t}[i+1], ' ', {t}[i+2]))"
    " ELSE array(array_join({t}, ' ')) END"
)


def q_minhash_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minhash-estimator calibration — the eval harness that answers
    'is the near-dup threshold trustworthy?' BEFORE a corpus-scale
    dedup run (the `ann_recall_eval` analog for the dedup side): for
    constructed pairs at three similarity levels (near-copy, half
    overlap, unrelated), compare the CAL_PERMS-permutation minhash
    match fraction against the exact shingle Jaccard.  The estimator
    is unbiased with sd ≈ sqrt(J(1-J)/16) ≈ 0.12 — err_e5 quantifies
    it per pair, exact BIGINTs everywhere (matches·1e5 DIV perms vs
    inter·1e5 DIV union).

    The production dedup path keeps its numpy/xxh3 signatures
    (operators/dedup.py); this harness uses the SQL-expressible
    md5+knuth permutation family so the whole computation is
    oracle-checkable end to end.

    Scale shape: ONE co-partitioned self-equi-join (d, d+1) builds the
    pair table; everything after is a per-row fold — signatures via
    array_min over transform (no shingle explode, no shuffle), exact
    Jaccard via array_intersect on deduped shingle arrays."""
    docs = (
        _docs(spark, sf_dir)
        .where(F.trim("text") != "")
        .select("doc_id", F.lower(F.trim("text")).alias("txt"))
    )
    a = docs.select(
        F.col("doc_id").alias("doc_a"), F.col("txt").alias("ta")
    ).where(F.col("doc_a") % CAL_EVERY == 0)
    b = docs.select(
        (F.col("doc_id") - 1).alias("doc_a"), F.col("txt").alias("tb")
    )
    pairs = (
        a.join(b, "doc_a")
        .select(
            "doc_a",
            F.split(F.col("ta"), "[ \\t\\n\\x0B\\f\\r]+").alias("wa"),
            F.split(F.col("tb"), "[ \\t\\n\\x0B\\f\\r]+").alias("wb"),
        )
        .select(
            "doc_a",
            F.explode(
                F.expr(
                    "array("
                    "struct('near' AS pair_kind,"
                    " wa AS ka,"
                    " concat(wa, array('extra!')) AS kb),"
                    "struct('half' AS pair_kind,"
                    " wa AS ka,"
                    " concat(slice(wa, 1, (size(wa) + 1) DIV 2),"
                    "        slice(wb, size(wb) DIV 2 + 1,"
                    "              size(wb) - size(wb) DIV 2)) AS kb),"
                    "struct('far' AS pair_kind, wa AS ka, wb AS kb))"
                )
            ).alias("p"),
        )
        .select("doc_a", "p.pair_kind", "p.ka", "p.kb")
    )
    sh = pairs.select(
        "doc_a",
        "pair_kind",
        F.expr(_SHINGLES_EXPR.format(t="ka")).alias("sa"),
        F.expr(_SHINGLES_EXPR.format(t="kb")).alias("sb"),
    )
    perm = (
        f"transform(sequence(0, {CAL_PERMS - 1}), k -> "
        f"array_min(transform({{s}}, g -> "
        f"(((cast(conv(substring(md5(g), 1, 13), 16, 10) AS bigint)"
        f" + k * {CAL_STEP}) % {KNUTH_P}) * {KNUTH_A}) % {KNUTH_P})))"
    )
    sig = sh.select(
        "doc_a",
        "pair_kind",
        F.size(F.array_distinct("sa")).cast("long").alias("n_sh_a"),
        F.size(F.array_distinct("sb")).cast("long").alias("n_sh_b"),
        F.size(
            F.array_intersect(F.array_distinct("sa"), F.array_distinct("sb"))
        )
        .cast("long")
        .alias("n_inter"),
        F.size(F.array_union("sa", "sb")).cast("long").alias("n_union"),
        F.expr(
            "size(filter(zip_with("
            + perm.format(s="sa")
            + ", "
            + perm.format(s="sb")
            + ", (x, y) -> x = y), v -> v))"
        )
        .cast("long")
        .alias("est_matches"),
    )
    return sig.select(
        "doc_a",
        "pair_kind",
        "n_sh_a",
        "n_sh_b",
        F.expr("(n_inter * 100000) DIV n_union").alias("exact_e5"),
        "est_matches",
        F.expr(f"(est_matches * 100000) DIV {CAL_PERMS}").alias("est_e5"),
        F.expr(
            f"(est_matches * 100000) DIV {CAL_PERMS}"
            " - (n_inter * 100000) DIV n_union"
        ).alias("err_e5"),
    )


# LSH banding layout over the CAL_PERMS signature — MIRRORED in
# `_lsh_bucket_stats_sql`; change together (CAL_PERMS/CAL_STEP and the
# md5-13-hex key flow in from the minhash_calibration spec).
LSH_BANDS = 4
LSH_ROWS = 4  # == CAL_PERMS DIV LSH_BANDS


def q_lsh_bucket_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH bucket-capacity audit — the join-cost forecast a pipeline
    runs BEFORE the banded dedup self-join: per band, the bucket
    count, the largest bucket, the singleton count, and the exact
    candidate-pair total Σ c·(c−1)/2 the band will feed the verify
    stage.  This is the number that decides DEFAULT_BUCKET_CAP and
    the shuffle partition count — a skewed band shows up here as one
    hot bucket long before it shows up as a straggler task.

    Cross-engine: signatures are the minhash_calibration spec
    (md5-13-hex key + knuth permutations — CAL_PERMS/CAL_STEP flow
    in); band keys join the LSH_ROWS signature values as a CSV string
    (explicit per-element CAST both engines); all outputs BIGINT
    (c·(c−1) exact to ~3·10^9 docs/bucket — far past any capped
    bucket).

    Scale shape: signature is a pure per-row map; the band explode is
    ×LSH_BANDS; ONE (band, bucket) hash agg then a bands-scale agg —
    exactly the shape of the production banded join's build side."""
    base = (
        _docs(spark, sf_dir)
        .select("doc_id", "text")
        .where(F.trim("text") != "")
        .select("doc_id", _lm_tokens().alias("t"))
    )
    perm = (
        f"transform(sequence(0, {CAL_PERMS - 1}), k -> "
        f"array_min(transform(s, g -> "
        f"(((cast(conv(substring(md5(g), 1, 13), 16, 10) AS bigint)"
        f" + k * {CAL_STEP}) % {KNUTH_P}) * {KNUTH_A}) % {KNUTH_P})))"
    )
    sig = base.select(
        "doc_id", F.expr(_SHINGLES_EXPR.format(t="t")).alias("s")
    ).select("doc_id", F.expr(perm).alias("sig"))
    bands = sig.select(
        F.expr(
            f"explode(transform(sequence(0, {LSH_BANDS - 1}), b -> "
            f"struct(CAST(b AS BIGINT) AS band, "
            f"array_join(transform(slice(sig, b * {LSH_ROWS} + 1, "
            f"{LSH_ROWS}), x -> CAST(x AS STRING)), ',') AS bucket)))"
        ).alias("e")
    ).select("e.band", "e.bucket")
    counts = bands.groupBy("band", "bucket").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    return counts.groupBy("band").agg(
        F.count(F.lit(1)).cast("long").alias("n_buckets"),
        F.sum("c").cast("long").alias("n_docs"),
        F.max("c").cast("long").alias("max_bucket"),
        F.sum(F.when(F.col("c") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_singletons"),
        F.sum(F.expr("(c * (c - 1)) DIV 2")).cast("long").alias(
            "cand_pairs"
        ),
    )


def _lsh_bucket_stats_sql() -> str:
    """lsh_bucket_stats oracle: the same signature spec, 1-based list
    slices per band, CSV band keys, exact pair-count aggregation."""
    return f"""
WITH toks AS (
  SELECT doc_id,
         regexp_split_to_array(trim(lower(text)),
                               '[ \\t\\n\\x0B\\f\\r]+') AS t
  FROM documents WHERE trim(text) <> ''
), sh AS (
  SELECT doc_id,
    CASE WHEN len(t) >= 3 THEN list_transform(generate_series(1, len(t) - 2),
          i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
         ELSE [array_to_string(t, ' ')] END AS s
  FROM toks
), sig AS (
  SELECT doc_id,
    list_transform(generate_series(0, {CAL_PERMS - 1}), k ->
      list_min(list_transform(s, g ->
        (((('0x' || substr(md5(g), 1, 13))::BIGINT + k * {CAL_STEP})
          % {KNUTH_P}) * {KNUTH_A}) % {KNUTH_P}))) AS sig
  FROM sh
), bands AS (
  SELECT CAST(r.b AS BIGINT) AS band,
         array_to_string(list_transform(
           sig[r.b * {LSH_ROWS} + 1 : r.b * {LSH_ROWS} + {LSH_ROWS}],
           x -> CAST(x AS VARCHAR)), ',') AS bucket
  FROM sig CROSS JOIN range(0, {LSH_BANDS}) r(b)
), counts AS (
  SELECT band, bucket, CAST(count(*) AS BIGINT) AS c
  FROM bands GROUP BY 1, 2
)
SELECT band,
  CAST(count(*) AS BIGINT) AS n_buckets,
  CAST(sum(c) AS BIGINT) AS n_docs,
  CAST(max(c) AS BIGINT) AS max_bucket,
  CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_singletons,
  CAST(sum((c * (c - 1)) // 2) AS BIGINT) AS cand_pairs
FROM counts GROUP BY 1
"""


def q_blocking_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocking-quality metrics for the LSH dedup index (the record-
    linkage evaluation pair, Christen 2012): REDUCTION RATIO (what
    fraction of the N(N−1)/2 all-pairs space the band blocking
    avoids) and PAIRS COMPLETENESS (what fraction of TRUE duplicate
    pairs still share a block) — the two numbers that price any
    blocking scheme, measured against the injected-dup ground truth
    (each %20 base doc owes three true pairs: base↔exact, base↔near,
    exact↔near).  `lsh_bucket_stats` measures bucket SHAPE; this
    measures blocking QUALITY against truth — together they are the
    dedup-index acceptance test.

    Cross-engine: the signature/band chain is the minhash_calibration
    / lsh_bucket_stats spec verbatim (CAL_PERMS/STEP, LSH_BANDS/ROWS
    and the md5-13-hex key flow in); candidate pairs are DISTINCT
    (a<b) over shared (band, bucket); all counts and the e6 ratios
    are exact BIGINTs.

    Scale shape: bands are a pure map; candidates come from the
    in-bucket self-join (bounded by bucket sizes — the LSH design
    point); truth is a pure map over the %20 slice; three scalar
    aggs merge into one row."""
    from rxtls_spark.operators.dedup import with_injected_dups

    docs = (
        with_injected_dups(
            _docs(spark, sf_dir).select("doc_id", "text", "lang")
        )
        .where(F.trim("text") != "")
        .select("doc_id", _lm_tokens().alias("t"))
    )
    perm = (
        f"transform(sequence(0, {CAL_PERMS - 1}), k -> "
        f"array_min(transform(s, g -> "
        f"(((cast(conv(substring(md5(g), 1, 13), 16, 10) AS bigint)"
        f" + k * {CAL_STEP}) % {KNUTH_P}) * {KNUTH_A}) % {KNUTH_P})))"
    )
    sig = docs.select(
        "doc_id", F.expr(_SHINGLES_EXPR.format(t="t")).alias("s")
    ).select("doc_id", F.expr(perm).alias("sig"))
    bands = sig.select(
        "doc_id",
        F.expr(
            f"explode(transform(sequence(0, {LSH_BANDS - 1}), b -> "
            f"struct(CAST(b AS BIGINT) AS band, "
            f"array_join(transform(slice(sig, b * {LSH_ROWS} + 1, "
            f"{LSH_ROWS}), x -> CAST(x AS STRING)), ',') AS bucket)))"
        ).alias("e"),
    ).select("doc_id", "e.band", "e.bucket")
    cand = (
        bands.select(F.col("doc_id").alias("a"), "band", "bucket")
        .join(
            bands.select(F.col("doc_id").alias("b"), "band", "bucket"),
            ["band", "bucket"],
        )
        .where(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
        .localCheckpoint(eager=False)
    )
    base_ids = docs.select("doc_id").where(
        (F.col("doc_id") < 1_000_000_000) & (F.col("doc_id") % 20 == 0)
    )
    truth = base_ids.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("doc_id").alias("a"),
                    (F.col("doc_id") + 1_000_000_000).alias("b"),
                ),
                F.struct(
                    F.col("doc_id").alias("a"),
                    (F.col("doc_id") + 2_000_000_000).alias("b"),
                ),
                F.struct(
                    (F.col("doc_id") + 1_000_000_000).alias("a"),
                    (F.col("doc_id") + 2_000_000_000).alias("b"),
                ),
            )
        ).alias("p")
    ).select("p.a", "p.b")
    n_docs = docs.agg(F.count(F.lit(1)).cast("long").alias("n"))
    n_cand = cand.agg(F.count(F.lit(1)).cast("long").alias("n_cand"))
    n_true = truth.agg(F.count(F.lit(1)).cast("long").alias("n_true"))
    n_found = (
        truth.join(cand, ["a", "b"])
        .agg(F.count(F.lit(1)).cast("long").alias("n_found"))
    )
    return (
        n_docs.crossJoin(n_cand)
        .crossJoin(n_true)
        .crossJoin(n_found)
        .selectExpr(
            "n AS n_docs",
            "n_cand AS n_cand_pairs",
            "n_true AS n_true_pairs",
            "n_found",
            # DECIMAL(38,0) accumulation (degree_assortativity rule):
            # n·(n−1) and n_cand·1e6 ANSI-overflow BIGINT past ~3e9
            # docs; the final CAST keeps the BIGINT output type.
            "CAST(1000000 - (CAST(n_cand AS DECIMAL(38,0)) * 1000000)"
            " DIV ((CAST(n AS DECIMAL(38,0)) * (n - 1)) DIV 2)"
            " AS BIGINT) AS rr_e6",
            "CAST((n_found * 1000000) DIV n_true AS BIGINT) AS pc_e6",
        )
    )


def _blocking_quality_sql() -> str:
    """blocking_quality oracle: `_DUPS_CTE` universe, the
    lsh_bucket_stats signature/band SQL with doc_id kept, distinct
    shared-bucket pairs, the injected-truth pair list, exact e6
    ratios."""
    return _DUPS_CTE + f"""
, live AS (
  SELECT doc_id,
         regexp_split_to_array(trim(lower(text)),
                               '[ \\t\\n\\x0B\\f\\r]+') AS t
  FROM docs WHERE trim(text) <> ''
), sh AS (
  SELECT doc_id,
    CASE WHEN len(t) >= 3 THEN list_transform(generate_series(1, len(t) - 2),
          i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
         ELSE [array_to_string(t, ' ')] END AS s
  FROM live
), sig AS (
  SELECT doc_id,
    list_transform(generate_series(0, {CAL_PERMS - 1}), k ->
      list_min(list_transform(s, g ->
        (((('0x' || substr(md5(g), 1, 13))::BIGINT
           + k * {CAL_STEP}) % {KNUTH_P}) * {KNUTH_A}) % {KNUTH_P}))) AS sig
  FROM sh
), bands AS (
  SELECT doc_id, CAST(r.b AS BIGINT) AS band,
         array_to_string(list_transform(
           sig[r.b * {LSH_ROWS} + 1 : r.b * {LSH_ROWS} + {LSH_ROWS}],
           x -> CAST(x AS VARCHAR)), ',') AS bucket
  FROM sig CROSS JOIN range(0, {LSH_BANDS}) r(b)
), cand AS (
  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
  FROM bands x JOIN bands y
    ON x.band = y.band AND x.bucket = y.bucket AND x.doc_id < y.doc_id
), truth AS (
  SELECT doc_id AS a, doc_id + 1000000000 AS b FROM live
  WHERE doc_id < 1000000000 AND doc_id % 20 = 0
  UNION ALL
  SELECT doc_id, doc_id + 2000000000 FROM live
  WHERE doc_id < 1000000000 AND doc_id % 20 = 0
  UNION ALL
  SELECT doc_id + 1000000000, doc_id + 2000000000 FROM live
  WHERE doc_id < 1000000000 AND doc_id % 20 = 0
), sums AS (
  SELECT (SELECT CAST(count(*) AS BIGINT) FROM live) AS n,
         (SELECT CAST(count(*) AS BIGINT) FROM cand) AS n_cand,
         (SELECT CAST(count(*) AS BIGINT) FROM truth) AS n_true,
         (SELECT CAST(count(*) AS BIGINT)
          FROM truth t JOIN cand c ON t.a = c.a AND t.b = c.b) AS n_found
)
SELECT n AS n_docs, n_cand AS n_cand_pairs, n_true AS n_true_pairs,
       n_found,
       CAST(1000000 - (n_cand * 1000000)
            // ((n * (n - 1)) // 2) AS BIGINT) AS rr_e6,
       CAST((n_found * 1000000) // n_true AS BIGINT) AS pc_e6
FROM sums
"""


# DP release constants — MIRRORED in `_dp_noisy_counts_sql`; change
# together.  DP_EPS_E3 is the epsilon (e3); the two-sided geometric
# noise table is computed ONCE in Python from the inverse CDF at
# permille midpoints and spliced into BOTH engines as a literal array
# (the `_ndcg_weights` rule — no engine float walks the CDF); the
# per-group draw is the md5-13-hex → knuth permille of the group key
# (the bloom_dedup key pairing), salted so re-releases re-randomize.
DP_EPS_E3 = 1000
DP_SALT = "dp1"


def _dp_noise_table(eps_e3: int = DP_EPS_E3) -> list[int]:
    """Inverse-CDF table of the two-sided geometric mechanism at
    permille midpoints u = (2r+1)/2000, support ordered 0, −1, +1,
    −2, +2, … — the discrete Laplace that makes integer counts
    ε-differentially-private at sensitivity 1 (Ghosh et al. 2009,
    'Universally utility-maximizing privacy mechanisms')."""
    import math

    alpha = math.exp(-eps_e3 / 1000.0)
    p0 = (1 - alpha) / (1 + alpha)

    def inv(u: float) -> int:
        c = p0
        if u < c:
            return 0
        k = 1
        while True:
            pk = p0 * alpha**k
            c += pk
            if u < c:
                return -k
            c += pk
            if u < c:
                return k
            k += 1

    return [inv((2 * r + 1) / 2000.0) for r in range(1000)]


def q_dp_noisy_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ε-differentially-private release of the (source, lang) corpus
    histogram via the two-sided geometric mechanism — the privacy
    gate that pairs with `k_anonymity`: k-anonymity audits the
    record-level release, this releases AGGREGATES with a formal
    (ε=1) guarantee, the mechanism regulators and data-sharing
    agreements actually name.  Emits per group the true count (kept
    for the audit — the release column is noisy_n), the noise drawn,
    the released count (clamped ≥ 0), and the epsilon.

    Cross-engine: the noise table is a 1000-entry literal array
    identical in both engines; the draw is the deterministic
    md5(salt‖group) permille through the knuth permutation — pure
    BIGINT end to end, no engine float anywhere.

    Scale shape: ONE group hash agg (groups are metadata-scale) plus
    a pure map — the table lookup compiles into the row expression."""
    tab = _dp_noise_table()
    arr = F.array(*[F.lit(x) for x in tab])
    g = _docs(spark, sf_dir).groupBy("source", "lang").agg(
        F.count(F.lit(1)).cast("long").alias("true_n")
    )
    r = (
        F.expr(
            f"(((cast(conv(substring(md5(concat('{DP_SALT}', source, '|',"
            f" lang)), 1, 13), 16, 10) AS bigint)) % {KNUTH_P})"
            f" * {KNUTH_A}) % {KNUTH_P} % 1000"
        )
    ).alias("draw")
    out = g.select("source", "lang", "true_n", r)
    return out.select(
        "source",
        "lang",
        "true_n",
        F.element_at(arr, F.col("draw").cast("int") + 1)
        .cast("long")
        .alias("noise"),
        F.greatest(
            F.expr(
                "true_n + "
                + f"element_at(array({', '.join(str(x) for x in tab)}),"
                " cast(draw as int) + 1)"
            ),
            F.lit(0),
        )
        .cast("long")
        .alias("noisy_n"),
        F.lit(DP_EPS_E3).cast("long").alias("eps_e3"),
    )


def _dp_noisy_counts_sql() -> str:
    """dp_noisy_counts oracle: identical literal noise table, the
    same md5(salt‖group) knuth permille draw, clamped release."""
    tab = _dp_noise_table()
    lst = "[" + ", ".join(str(x) for x in tab) + "]"
    draw = (
        f"((((('0x' || substr(md5('{DP_SALT}' || source || '|' || lang),"
        f" 1, 13))::BIGINT) % {KNUTH_P}) * {KNUTH_A}) % {KNUTH_P}) % 1000"
    )
    return f"""
WITH g AS (
  SELECT source, lang, CAST(count(*) AS BIGINT) AS true_n
  FROM documents GROUP BY 1, 2
), d AS (
  SELECT source, lang, true_n, {draw} AS draw FROM g
)
SELECT source, lang, true_n,
       CAST({lst}[CAST(draw AS INT) + 1] AS BIGINT) AS noise,
       CAST(greatest(true_n + {lst}[CAST(draw AS INT) + 1], 0) AS BIGINT)
         AS noisy_n,
       CAST({DP_EPS_E3} AS BIGINT) AS eps_e3
FROM d
"""


# Poisson-bootstrap spec — BOOT_B / BOOT_DRAW_MUL / the rank picks and
# the `_poisson_weight_table` literals are MIRRORED in
# `_poisson_bootstrap_sql`; change together.  The weight table is the
# inverse CDF of Poisson(1) at permille midpoints, computed ONCE in
# Python and spliced into BOTH engines (the _dp_noise_table rule).
BOOT_B = 20
BOOT_DRAW_MUL = BOOT_B + 1  # (doc_id*MUL + b) is injective over b
BOOT_LO_RANK = 2            # 2nd smallest of 20 ≈ 5th percentile
BOOT_HI_RANK = BOOT_B - BOOT_LO_RANK + 1  # 19th ≈ 95th percentile


def _poisson_weight_table() -> list[int]:
    """Inverse CDF of Poisson(mean 1) at the 1000 permille midpoints
    (2r+1)/2000 — the per-(doc, replicate) resample weight of the
    Poisson bootstrap.  Values 0..6; the table mean is ~1 by
    construction (pytest-locked)."""
    import math

    def inv(u: float) -> int:
        c = 0.0
        k = 0
        pk = math.exp(-1.0)
        while True:
            c += pk
            if u < c:
                return k
            k += 1
            pk /= k

    return [inv((2 * r + 1) / 2000.0) for r in range(1000)]


def q_poisson_bootstrap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson-bootstrap confidence interval for per-source mean
    quality (Chamandy et al. 2012, 'Estimating uncertainty for
    massive data streams' — the Google web-scale bootstrap): the
    error bar a pipeline attaches to every quality dashboard number.
    Classic multinomial resampling needs the global row count up
    front; the Poisson approximation draws each doc's replicate
    weight w ~ Poisson(1) INDEPENDENTLY, so the whole thing is one
    streaming pass.  Emits per source the doc count, the point mean,
    and the [2nd, 19th]-of-20 replicate-mean order statistics (≈ 90%
    CI).

    Cross-engine: quality is the stable e5 BIGINT numerator; weights
    come from the spliced 1000-entry Poisson(1) inverse-CDF literal
    table indexed by the knuth permille of (doc_id·MUL + b); replicate
    means are Σw·q DIV Σw (truncating, non-negative); order stats are
    row_number ranks over the B=20 bounded replicate table — all
    BIGINT end to end, no engine float anywhere.

    Scale shape: ONE map-side explode (×B rows feeding a partial agg —
    the shuffle carries (source, b) partials, not the exploded rows),
    ONE (source, b) hash agg on B·n_sources keys, then metadata-scale
    windows over ≤B rows per source.  Σw·q_e5 < 2^63 to ~1.5·10^12
    docs/source (w ≤ 6, q_e5 ≤ 1e5)."""
    tab = _poisson_weight_table()
    arr = F.array(*[F.lit(x) for x in tab])
    qnum = F.floor(quality_score() * F.lit(100000.0) + F.lit(0.5)).cast(
        "long"
    )
    uni = _docs(spark, sf_dir).select(
        "source", "doc_id", qnum.alias("q_e5")
    )
    reps = uni.select(
        "source",
        "q_e5",
        "doc_id",
        F.explode(F.sequence(F.lit(1), F.lit(BOOT_B))).alias("b0"),
    ).select(
        "source",
        "q_e5",
        F.col("b0").cast("long").alias("b"),
        (
            knuth_hash(
                F.col("doc_id") * BOOT_DRAW_MUL + F.col("b0").cast("long")
            )
            % 1000
        ).alias("draw"),
    )
    dw = reps.select(
        "source",
        "b",
        "q_e5",
        F.element_at(arr, F.col("draw").cast("int") + 1)
        .cast("long")
        .alias("w"),
    )
    rb = dw.groupBy("source", "b").agg(
        F.sum("w").cast("long").alias("sw"),
        F.sum(F.col("w") * F.col("q_e5")).cast("long").alias("swq"),
    )
    means = rb.select(
        "source",
        "b",
        F.expr("CASE WHEN sw > 0 THEN swq DIV sw ELSE 0 END").alias(
            "mean_e5"
        ),
    )
    from pyspark.sql.window import Window

    wr = Window.partitionBy("source").orderBy("mean_e5", "b")
    ranked = means.withColumn("rk", F.row_number().over(wr))
    ci = ranked.groupBy("source").agg(
        F.max(
            F.when(F.col("rk") == BOOT_LO_RANK, F.col("mean_e5"))
        ).cast("long").alias("boot_lo_e5"),
        F.max(
            F.when(F.col("rk") == BOOT_HI_RANK, F.col("mean_e5"))
        ).cast("long").alias("boot_hi_e5"),
    )
    pt = uni.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.expr("CAST(sum(q_e5) DIV count(*) AS BIGINT)").alias("mean_e5"),
    )
    return pt.join(ci, "source").select(
        "source",
        "n_docs",
        "mean_e5",
        "boot_lo_e5",
        "boot_hi_e5",
        F.lit(BOOT_B).cast("long").alias("n_reps"),
    )


def _poisson_bootstrap_sql() -> str:
    """poisson_bootstrap oracle: identical spliced weight table, the
    same knuth permille draw over (doc_id·MUL + b), Σw·q DIV Σw
    replicate means, row_number order statistics."""
    tab = _poisson_weight_table()
    lst = "[" + ", ".join(str(x) for x in tab) + "]"
    return _TEXT_CTE + f"""
, qq AS (
  SELECT doc_id, CAST(floor(({_QUALITY_SQL}) * 100000 + 0.5) AS BIGINT) AS q_e5
  FROM feats
), uni AS (
  SELECT d.source, q.doc_id, q.q_e5
  FROM qq q JOIN (SELECT doc_id, source FROM documents) d
    ON q.doc_id = d.doc_id
), reps AS (
  SELECT source, doc_id, q_e5,
         unnest(generate_series(1, {BOOT_B})) AS b
  FROM uni
), dw AS (
  SELECT source, b, q_e5,
         CAST({lst}[CAST(((((doc_id * {BOOT_DRAW_MUL} + b) % {KNUTH_P})
              * {KNUTH_A}) % {KNUTH_P}) % 1000 AS INT) + 1] AS BIGINT) AS w
  FROM reps
), rb AS (
  SELECT source, b, CAST(sum(w) AS BIGINT) AS sw,
         CAST(sum(w * q_e5) AS BIGINT) AS swq
  FROM dw GROUP BY 1, 2
), means AS (
  SELECT source, b,
         CAST(CASE WHEN sw > 0 THEN swq // sw ELSE 0 END AS BIGINT)
           AS mean_e5
  FROM rb
), ranked AS (
  SELECT source, b, mean_e5,
         row_number() OVER (PARTITION BY source ORDER BY mean_e5, b) AS rk
  FROM means
), ci AS (
  SELECT source,
         CAST(max(CASE WHEN rk = {BOOT_LO_RANK} THEN mean_e5 END) AS BIGINT)
           AS boot_lo_e5,
         CAST(max(CASE WHEN rk = {BOOT_HI_RANK} THEN mean_e5 END) AS BIGINT)
           AS boot_hi_e5
  FROM ranked GROUP BY 1
), pt AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(CAST(sum(q_e5) AS BIGINT) // CAST(count(*) AS BIGINT)
              AS BIGINT) AS mean_e5
  FROM uni GROUP BY 1
)
SELECT pt.source, pt.n_docs, pt.mean_e5, ci.boot_lo_e5, ci.boot_hi_e5,
       CAST({BOOT_B} AS BIGINT) AS n_reps
FROM pt JOIN ci ON pt.source = ci.source
"""


# Boilerplate-removal spec — BP_W / BP_DF_MIN and the 8-token
# synthetic per-source header are MIRRORED in `_boilerplate_sql`;
# change together.  The header injection is the fixture that makes the
# DF signal real on the synthetic corpus (the injected-dup / injected-
# PII precedent): every doc of a source shares its header line, so
# header chunks have DF ≈ docs-per-source >> BP_DF_MIN while organic
# 8-grams over the ~60-token vocab never collide (60^8 >> corpus).
BP_W = 8
BP_DF_MIN = 10


def q_boilerplate_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Line-frequency boilerplate removal (the CCNet / RefinedWeb
    paragraph-dedup step): drop every "line" — here the BP_W-token
    non-overlapping window, the single-line synthetic corpus's proxy
    for a line — that occurs in >= BP_DF_MIN DISTINCT documents
    (nav bars, footers, cookie banners: high document frequency IS
    the definition of boilerplate), then rebuild each document from
    its surviving lines in order.  Distinct from dedup: cdc_chunk /
    span_dedup keep ONE copy of a repeated chunk; boilerplate removal
    deletes EVERY copy once the chunk crosses the DF threshold.
    Emits per doc: total/dropped/kept line counts, kept token count,
    and the md5 of the rebuilt text.

    Cross-engine: tokens via the shared explicit whitespace class;
    lines built by the SAME transform/slice expression both engines
    (0-based window index i -> tokens[i*W+1 .. i*W+W], 1-based
    inclusive slicing, both clamp the final partial window); DF is
    count(DISTINCT doc_id) over the line md5; the rebuild is an
    idx-ordered string_agg / sort_array(collect_list) — and the empty
    rebuild coalesces to '' on BOTH engines (the MLM labels_md5
    gotcha: DuckDB string_agg over zero rows is NULL where Spark
    concat_ws gives '').

    Scale shape: map-side explode of (doc_id, idx, line_md5) → ONE
    DF hash agg (partial-agg combinable) → the over-threshold set is
    corpus_lines/BP_DF_MIN at worst and joins back as a broadcast
    anti-join (the dedup bucket-cap discipline) → ONE doc_id
    re-aggregation rebuilds survivors.  No window over data rows; the
    per-doc sort_array sorts ≤ lines-per-doc elements."""
    hdr = F.concat(
        F.lit("nav "),
        F.col("source"),
        F.lit(" home about contact login search footer"),
    )
    toks = F.split(
        F.trim(F.concat(hdr, F.lit(" "), F.col("text"))),
        "[ \\t\\n\\x0B\\f\\r]+",
    )
    base = _docs(spark, sf_dir).select(
        "doc_id",
        toks.alias("t"),
    ).select(
        "doc_id",
        "t",
        F.expr(f"(size(t) + {BP_W - 1}) DIV {BP_W}").alias("nch"),
        F.size("t").cast("long").alias("n_tokens"),
    )
    ex = base.select(
        "doc_id",
        "t",
        F.explode(F.sequence(F.lit(0), F.col("nch") - 1)).alias("idx"),
    ).select(
        "doc_id",
        F.col("idx").cast("long").alias("idx"),
        F.concat_ws(
            " ", F.expr(f"slice(t, idx * {BP_W} + 1, {BP_W})")
        ).alias("line"),
    ).withColumn("lmd5", F.md5("line"))
    df_ = ex.groupBy("lmd5").agg(
        F.countDistinct("doc_id").cast("long").alias("df")
    )
    bp = df_.where(F.col("df") >= BP_DF_MIN).select("lmd5")
    kept = ex.join(F.broadcast(bp), "lmd5", "left_anti")
    reb = kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_kept"),
        F.sum(F.expr("size(split(line, ' '))"))
        .cast("long")
        .alias("n_kept_tokens"),
        F.md5(
            F.concat_ws(
                " ",
                F.expr(
                    "transform(sort_array(collect_list(struct(idx, line))),"
                    " s -> s.line)"
                ),
            )
        ).alias("kept_md5"),
    )
    tot = base.select("doc_id", "nch", "n_tokens")
    return tot.join(reb, "doc_id", "left").select(
        "doc_id",
        F.col("nch").alias("n_lines"),
        (F.col("nch") - F.coalesce("n_kept", F.lit(0))).cast("long").alias(
            "n_bp"
        ),
        F.coalesce("n_kept", F.lit(0).cast("long")).alias("n_kept"),
        F.coalesce("n_kept_tokens", F.lit(0).cast("long")).alias(
            "n_kept_tokens"
        ),
        F.coalesce("kept_md5", F.md5(F.lit(""))).alias("kept_md5"),
    )


def _boilerplate_sql(w: int = BP_W, df_min: int = BP_DF_MIN) -> str:
    """boilerplate_lines oracle: identical header injection, window
    slicing, DF threshold, and idx-ordered rebuild (string_agg ORDER
    BY idx; the empty rebuild coalesces to '')."""
    return f"""
WITH base AS (
  SELECT doc_id,
         regexp_split_to_array(
           trim('nav ' || source || ' home about contact login search '
                || 'footer ' || text),
           '[ \\t\\n\\x0B\\f\\r]+') AS t
  FROM documents
), sized AS (
  SELECT doc_id, t,
         CAST((len(t) + {w - 1}) // {w} AS BIGINT) AS nch,
         CAST(len(t) AS BIGINT) AS n_tokens
  FROM base
), ex0 AS (
  SELECT doc_id, t,
         unnest(generate_series(0, CAST(nch AS INT) - 1)) AS idx
  FROM sized
), ex AS (
  SELECT doc_id, CAST(idx AS BIGINT) AS idx,
         array_to_string(t[idx * {w} + 1 : idx * {w} + {w}], ' ') AS line
  FROM ex0
), exm AS (
  SELECT doc_id, idx, line, md5(line) AS lmd5 FROM ex
), dfc AS (
  SELECT lmd5, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
  FROM exm GROUP BY 1
), bp AS (
  SELECT lmd5 FROM dfc WHERE df >= {df_min}
), kept AS (
  SELECT exm.* FROM exm LEFT JOIN bp ON exm.lmd5 = bp.lmd5
  WHERE bp.lmd5 IS NULL
), reb AS (
  SELECT doc_id,
         CAST(count(*) AS BIGINT) AS n_kept,
         CAST(sum(len(string_split(line, ' '))) AS BIGINT)
           AS n_kept_tokens,
         md5(coalesce(string_agg(line, ' ' ORDER BY idx), '')) AS kept_md5
  FROM kept GROUP BY 1
)
SELECT s.doc_id,
       s.nch AS n_lines,
       CAST(s.nch - coalesce(reb.n_kept, 0) AS BIGINT) AS n_bp,
       CAST(coalesce(reb.n_kept, 0) AS BIGINT) AS n_kept,
       CAST(coalesce(reb.n_kept_tokens, 0) AS BIGINT) AS n_kept_tokens,
       coalesce(reb.kept_md5, md5('')) AS kept_md5
FROM sized s LEFT JOIN reb ON s.doc_id = reb.doc_id
"""


# HyperLogLog spec — MIRRORED in `_hll_distinct_sql`; change
# together.  m = 64 registers from the low 6 bits of the md5-13-hex
# key; rho = leading-zero rank of the remaining 46 bits via the
# SPLICED CASE ladder `_hll_rho_case` (one Python helper, both
# engines — no engine log2 anywhere near a power of two); the
# harmonic sum is EXACT: Σ 2^(47−M_j) as BIGINT over denominator
# 2^47.  The small-range linear-counting branch exists for spec
# fidelity; with vocab >> m it never fires here (pytest-locked).
HLL_M = 64
HLL_REM_BITS = 46


def _hll_rho_case(var: str) -> str:
    """CASE ladder: rank of the highest set bit of the 46-bit `var`
    counted from the top (1 = top bit set … 46 = lowest bit only,
    47 = zero) — identical text spliced into BOTH engines."""
    whens = " ".join(
        f"WHEN {var} >= {1 << (HLL_REM_BITS - k)} THEN {k}"
        for k in range(1, HLL_REM_BITS + 1)
    )
    return f"CASE {whens} ELSE {HLL_REM_BITS + 1} END"


def q_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """From-scratch HyperLogLog distinct-BIGRAM estimate next to the
    exact count (Flajolet et al. 2007) — the oracle-checkable twin of
    `distinct_domains_approx` (whose built-in HLL sketch DuckDB
    cannot mirror, so the driver only row-checks it): every piece
    here — md5 bucketing, leading-zero registers, the harmonic sum —
    is deterministic and identical in both engines, so the SKETCH
    ITSELF is value-hash-checked, not just its row count.  Emits one
    row: registers used, the exact integer harmonic numerator, the
    e3 estimate, the exact distinct count, and the signed permille
    error.

    Cross-engine: key = md5-13-hex BIGINT (the bloom_dedup pairing);
    bucket = key % m, remainder = key DIV m; rho via the spliced CASE
    ladder; register max and Σ 2^(47−M_j) are pure BIGINT; the final
    estimate α·m²·2^47 / S is the ONE-expression double on the exact
    BIGINT S (identical operands → identical IEEE result), e3-floored.

    Scale shape: token explode → ONE hash agg onto ≤m register rows
    (map-side combine reduces every partition to ≤m rows — the
    classic sketch shape, exactly why HLL exists at 100 TB); the
    exact count (audit column) is the standard two-exchange distinct;
    the combine is a 1-row crossJoin."""
    docs = (
        _docs(spark, sf_dir)
        .select("text")
        .where(F.trim("text") != "")
    )
    # bigram types (not unigrams): the synthetic vocabulary is ~60
    # tokens — fewer than the m=64 registers — which would park the
    # sketch in the linear-counting corner; bigram cardinality is in
    # the thousands and exercises the standard estimator path.
    toks = docs.select(F.explode(_bigrams()).alias("g"))
    keyed = toks.select(
        F.expr(
            "cast(conv(substring(md5(g), 1, 13), 16, 10) AS bigint)"
        ).alias("x")
    ).select(
        (F.col("x") % HLL_M).alias("b"),
        F.expr(
            _hll_rho_case(f"(x DIV {HLL_M})")
        ).cast("long").alias("rho"),
    )
    regs = keyed.groupBy("b").agg(F.max("rho").cast("long").alias("m_j"))
    sk = regs.groupBy().agg(
        F.count(F.lit(1)).cast("long").alias("n_used"),
        F.sum(
            F.expr(
                f"shiftleft(CAST(1 AS BIGINT),"
                f" CAST({HLL_REM_BITS + 1} - m_j AS INT))"
            )
        )
        .cast("long")
        .alias("s_present"),
    )
    exact = toks.agg(
        F.countDistinct("g").cast("long").alias("n_exact")
    )
    both = sk.crossJoin(F.broadcast(exact))
    two47 = 1 << (HLL_REM_BITS + 1)
    raw = (
        f"((CAST(0.7213 AS DOUBLE) / (CAST(1.0 AS DOUBLE)"
        f" + CAST(1.079 AS DOUBLE) / {HLL_M}.0)) * {HLL_M}.0 * {HLL_M}.0"
        f" * {two47}.0 / CAST(s_num AS DOUBLE))"
    )
    lin = f"({HLL_M}.0 * ln({HLL_M}.0 / CAST({HLL_M} - n_used AS DOUBLE)))"
    return both.select(
        F.lit(HLL_M).cast("long").alias("m"),
        "n_used",
        F.expr(
            f"s_present + ({HLL_M} - n_used) * CAST({two47} AS BIGINT)"
        ).alias("s_num"),
        "n_exact",
    ).select(
        "m",
        "n_used",
        "s_num",
        F.expr(
            f"CAST(floor(CASE WHEN {HLL_M} - CAST(n_used AS INT) > 0"
            f" AND {raw} <= 2.5 * {HLL_M}.0 THEN {lin}"
            f" ELSE {raw} END * 1000) AS BIGINT)"
        ).alias("est_e3"),
        "n_exact",
        F.expr(
            "((CAST(floor(CASE WHEN "
            + f"{HLL_M} - CAST(n_used AS INT) > 0 AND {raw} <= 2.5 * {HLL_M}.0"
            + f" THEN {lin} ELSE {raw} END * 1000) AS BIGINT)"
            + " - n_exact * 1000) * 1000) DIV (n_exact * 1000)"
        ).alias("err_permille"),
    )


def _hll_distinct_sql() -> str:
    """hll_distinct oracle: identical key split, the same spliced rho
    ladder, BIGINT registers/harmonic numerator, identical estimate
    expression."""
    two47 = 1 << (HLL_REM_BITS + 1)
    raw = (
        f"((CAST(0.7213 AS DOUBLE) / (CAST(1.0 AS DOUBLE)"
        f" + CAST(1.079 AS DOUBLE) / {HLL_M}.0)) * {HLL_M}.0 * {HLL_M}.0"
        f" * {two47}.0 / CAST(s_num AS DOUBLE))"
    )
    lin = f"({HLL_M}.0 * ln({HLL_M}.0 / CAST({HLL_M} - n_used AS DOUBLE)))"
    est = (
        f"CAST(floor(CASE WHEN {HLL_M} - CAST(n_used AS INT) > 0"
        f" AND {raw} <= 2.5 * {HLL_M}.0 THEN {lin}"
        f" ELSE {raw} END * 1000) AS BIGINT)"
    )
    return f"""
WITH tt AS (
  SELECT regexp_split_to_array(trim(lower(text)),
                               '[ \\t\\n\\x0B\\f\\r]+') AS t
  FROM documents WHERE trim(text) <> ''
), toks AS (
  SELECT unnest(list_transform(generate_series(1, len(t) - 1),
                               i -> t[i] || ' ' || t[i+1])) AS g
  FROM tt
), keyed AS (
  SELECT ('0x' || substr(md5(g), 1, 13))::BIGINT AS x FROM toks
), rr AS (
  SELECT x % {HLL_M} AS b,
         {_hll_rho_case(f"(x // {HLL_M})")} AS rho
  FROM keyed
), regs AS (
  SELECT b, CAST(max(rho) AS BIGINT) AS m_j FROM rr GROUP BY 1
), sk AS (
  SELECT CAST(count(*) AS BIGINT) AS n_used,
         CAST(sum(CAST(1 AS BIGINT) << CAST({HLL_REM_BITS + 1} - m_j AS INT))
              AS BIGINT) AS s_present
  FROM regs
), ex AS (
  SELECT CAST(count(DISTINCT g) AS BIGINT) AS n_exact FROM toks
), comb AS (
  SELECT CAST({HLL_M} AS BIGINT) AS m, n_used,
         s_present + ({HLL_M} - n_used) * CAST({two47} AS BIGINT) AS s_num,
         n_exact
  FROM sk, ex
)
SELECT m, n_used, s_num, {est} AS est_e3, n_exact,
       CAST((({est} - n_exact * 1000) * 1000) // (n_exact * 1000)
            AS BIGINT) AS err_permille
FROM comb
"""


# Blocklist spec — MIRRORED in the `blocklist_filter` oracle SQL;
# change together.  Substring (not token) matching by design — the
# UT1/wordlist convention, catches phrases across token boundaries;
# occurrence count = (len(t) − len(replace(t, p, ''))) / len(p), and
# replace() scans left-to-right non-overlapping on Spark, DuckDB and
# Python alike (the bpe_apply_merge guarantee), so counts match.
# Severity is the weighted occurrence sum; CASE order IS the verdict
# semantics (the filter_cascade discipline).
BLOCK_PHRASES = (
    ("slow query", 5),
    ("slow hash", 3),
    ("fast key", 2),
    ("spark", 1),
)
BLOCK_T_BLOCK = 5
BLOCK_T_REVIEW = 2


def q_blocklist_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Phrase-blocklist screening — the UT1-style wordlist gate every
    web-scale corpus runs (NSFW/spam/boilerplate phrase lists):
    per-doc occurrence counts for each listed phrase, a weighted
    severity score, and a block/review/clean verdict.  The list is a
    LITERAL (broadcast-free: it compiles into the row expression —
    the lm_score literal-map pattern), counts are exact integers from
    the length-delta trick, and the verdict CASE is ordered
    block-first so a high-severity doc can't land in 'review'.

    Scale shape: pure per-row JVM expressions, zero exchanges, no UDF
    — at 10^12 rows this is a map-only scan, the cheapest possible
    plan.  A real deployment swaps the literal tuple for a generated
    one (thousands of phrases still compile fine; beyond that,
    contains-join against a broadcast list)."""
    occs = {
        p: F.expr(
            f"(length(lower(text))"
            f" - length(replace(lower(text), '{p}', ''))) DIV {len(p)}"
        )
        for p, _ in BLOCK_PHRASES
    }
    sev = None
    for p, w in BLOCK_PHRASES:
        term = occs[p] * F.lit(w)
        sev = term if sev is None else sev + term
    cols = [
        occs[p].alias(f"n_{p.replace(' ', '_')}") for p, _ in BLOCK_PHRASES
    ]
    return _docs(spark, sf_dir).select(
        "doc_id",
        *cols,
        sev.alias("severity"),
        F.when(sev >= BLOCK_T_BLOCK, F.lit("block"))
        .when(sev >= BLOCK_T_REVIEW, F.lit("review"))
        .otherwise(F.lit("clean"))
        .alias("verdict"),
    )


# Char-entropy alphabet — MIRRORED in the `char_entropy` oracle SQL;
# change together.  Buckets: 'a'..'z', '0'..'9', space, plus one
# catch-all 'other' bucket (n − counted), over lower(text).  The
# entropy fold is exact-int: H_e3 = Σ cnt·(ln_e3(n) − ln_e3(cnt))
# DIV n with ln_e3(x) = floor(ln(x)·1000) — gibberish/binary-noise
# detection, the char-level complement of the token-level quality
# features.
ENTROPY_CHARS = tuple("abcdefghijklmnopqrstuvwxyz0123456789 ")


def q_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document character-level Shannon entropy over a bounded
    alphabet — low entropy flags repeated-char spam ('aaaa…'),
    high entropy flags base64/binary noise; natural prose sits in a
    band.  Counts per bucket come from the length-delta trick (37
    literal replace() terms — whole-stage-codegen JVM, no histogram
    map), so the plan is a ZERO-exchange map-only scan like
    `blocklist_filter`.

    Exactness: every bucket count is an exact BIGINT; the entropy sum
    uses e3-floored ln on both engines and one truncating division at
    the end — bit-identical cross-engine, no float accumulation."""
    t = F.lower(F.col("text"))
    n = F.length(t).cast("long")
    counted = None
    terms = []
    for c in ENTROPY_CHARS:
        lit = c.replace("'", "''")
        cnt = (
            F.length(t) - F.length(F.expr(f"replace(lower(text), '{lit}', '')"))
        ).cast("long")
        terms.append(cnt)
        counted = cnt if counted is None else counted + cnt
    other = n - counted
    ln_e3 = lambda col: F.floor(  # noqa: E731 — shared fold atom
        F.log(col.cast("double")) * 1000.0
    ).cast("long")
    h = None
    for cnt in [*terms, other]:
        term = F.when(cnt > 0, cnt * (ln_e3(n) - ln_e3(cnt))).otherwise(
            F.lit(0)
        )
        h = term if h is None else h + term
    return (
        _docs(spark, sf_dir)
        .where(F.length("text") > 0)
        .select(
            "doc_id",
            n.alias("n_chars_l"),
            other.alias("n_other"),
            h.alias("h_sum_e3"),
        )
        .withColumn("entropy_e3", F.expr("h_sum_e3 DIV n_chars_l"))
    )


# Scorer-agreement sample size — MIRRORED in the `scorer_agreement`
# oracle SQL; change together.  Spearman is computed on a
# deterministic knuth-hash sample of ≤ AGREE_K docs per source
# because the n·(n²−1) denominator overflows BIGINT near n = 2·10^6 —
# the bounded sample keeps the formula exact at ANY corpus size (and
# is how you'd estimate rank agreement at 10^12 rows anyway).  Ranks
# use the deterministic (score, doc_id) tie-break instead of the
# classical midrank — a documented deviation, mirrored on both
# engines, that keeps every quantity an exact integer.
AGREE_K = 500


def q_scorer_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source Spearman rank agreement between two INDEPENDENT
    quality signals — the heuristic quality score (alpha/length/punct)
    and the corpus-IDF rarity score — the meta-eval a pipeline runs
    before trusting any single filter: sources where cheap signals
    rank documents consistently can be gated by either; sources where
    they disagree need the expensive model-based scorer.
    rho_e6 = 1e6 − (6·Σd²·1e6) DIV (n(n²−1)) over per-source sampled
    ranks — every term an exact BIGINT.

    Scale shape: the rarity half is the proven `doc_rarity` chain
    (distributed df equi-join); the quality half is per-row.  The
    sample window + two rank windows all partition by source (the
    zipf/stratified few-fat-partitions shape, one exchange reused);
    the final agg is sources-scale."""
    from pyspark.sql.window import Window

    rar = q_doc_rarity(spark, sf_dir).select("doc_id", "rarity_e3")
    qnum = F.floor(quality_score() * F.lit(100000.0) + F.lit(0.5)).cast(
        "long"
    )
    uni = (
        _docs(spark, sf_dir)
        .select(
            "source",
            "doc_id",
            qnum.alias("qnum"),
            knuth_hash(F.col("doc_id")).alias("h"),
        )
        .join(rar, "doc_id")
    )
    ws = Window.partitionBy("source")
    keep = uni.withColumn(
        "srk", F.row_number().over(ws.orderBy("h", "doc_id"))
    ).where(F.col("srk") <= AGREE_K)
    ranked = keep.select(
        "source",
        F.row_number()
        .over(ws.orderBy("qnum", "doc_id"))
        .cast("long")
        .alias("ra"),
        F.row_number()
        .over(ws.orderBy("rarity_e3", "doc_id"))
        .cast("long")
        .alias("rb"),
    )
    agg = ranked.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum((F.col("ra") - F.col("rb")) * (F.col("ra") - F.col("rb")))
        .cast("long")
        .alias("sum_d2"),
    )
    return agg.where(F.col("n") >= 2).select(
        "source",
        "n",
        "sum_d2",
        F.expr(
            "1000000 - (6 * sum_d2 * 1000000) DIV (n * (n * n - 1))"
        ).alias("rho_e6"),
    )


def q_scorer_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall's τ-b between the two quality signals per source —
    completing the agreement trio (`scorer_agreement` = Spearman on
    ranks, `scorer_kappa` = categorical, this = pairwise concordance
    with PROPER tie handling, which Spearman's midrank-free rank
    formula on this data quietly lacks): over the SAME
    knuth-sampled ≤AGREE_K docs per source, count concordant /
    discordant / tied pairs of (quality, rarity) and report
    τ-b = (C − D)/√((T − Tx)(T − Ty)).

    Cross-engine exact: the sample is the shared (knuth h, doc_id)
    rule; C/D/Tx/Ty are exact BIGINT counts from the in-source pair
    self-join (sign tests on the e5/e3 integer scores — no ranks
    needed at all, Kendall's definitional form); τ-b is the ONE
    explicitly-ordered float expression (the kn_bigram rule)
    e6-floored.  T = n(n−1)/2 exact.

    Scale shape: the bounded per-source sample makes the pair join
    ≤ AGREE_K²/2 rows per source (the scorer_agreement scale
    argument — pairwise statistics are only scale-safe over bounded
    samples); one hash agg ends it."""
    from pyspark.sql.window import Window

    rar = q_doc_rarity(spark, sf_dir).select("doc_id", "rarity_e3")
    qnum = F.floor(quality_score() * F.lit(100000.0) + F.lit(0.5)).cast(
        "long"
    )
    uni = (
        _docs(spark, sf_dir)
        .select(
            "source",
            "doc_id",
            qnum.alias("qnum"),
            knuth_hash(F.col("doc_id")).alias("h"),
        )
        .join(rar, "doc_id")
    )
    ws = Window.partitionBy("source")
    keep = (
        uni.withColumn(
            "srk", F.row_number().over(ws.orderBy("h", "doc_id"))
        )
        .where(F.col("srk") <= AGREE_K)
        .select("source", "doc_id", "qnum", "rarity_e3")
        .localCheckpoint(eager=False)
    )
    a = keep.select(
        "source",
        F.col("doc_id").alias("da"),
        F.col("qnum").alias("qa"),
        F.col("rarity_e3").alias("ra"),
    )
    b = keep.select(
        "source",
        F.col("doc_id").alias("db"),
        F.col("qnum").alias("qb"),
        F.col("rarity_e3").alias("rb"),
    )
    pairs = (
        a.join(b, "source")
        .where(F.col("da") < F.col("db"))
        .select(
            "source",
            F.signum(F.col("qa") - F.col("qb")).cast("long").alias("sx"),
            F.signum(F.col("ra") - F.col("rb")).cast("long").alias("sy"),
        )
    )
    agg = pairs.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("t_pairs"),
        F.sum(
            ((F.col("sx") * F.col("sy")) == 1).cast("long")
        )
        .cast("long")
        .alias("c_pairs"),
        F.sum(
            ((F.col("sx") * F.col("sy")) == -1).cast("long")
        )
        .cast("long")
        .alias("d_pairs"),
        F.sum((F.col("sx") == 0).cast("long")).cast("long").alias("tx"),
        F.sum((F.col("sy") == 0).cast("long")).cast("long").alias("ty"),
    )
    return agg.selectExpr(
        "source",
        "t_pairs",
        "c_pairs",
        "d_pairs",
        "tx",
        "ty",
        "CAST(CASE WHEN t_pairs > tx AND t_pairs > ty THEN"
        " floor(CAST(c_pairs - d_pairs AS DOUBLE)"
        " / sqrt(CAST(t_pairs - tx AS DOUBLE)"
        " * CAST(t_pairs - ty AS DOUBLE)) * 1000000.0)"
        " ELSE 0 END AS BIGINT) AS tau_b_e6",
    )


def _scorer_kendall_sql(k: int | None = None) -> str:
    """scorer_kendall oracle: the SHARED `_RARITY_QNUM_CTES` chain
    (edit once — scorer_agreement moves too), the identical knuth
    sample, definitional sign-pair counting, the one-expression
    τ-b float e6-floored."""
    k = AGREE_K if k is None else k
    return _TEXT_CTE + f"""
{_RARITY_QNUM_CTES}
, uni AS (
  SELECT d.source, d.doc_id, qq.qnum, ra.rarity_e3,
         (((d.doc_id % {KNUTH_P}) * {KNUTH_A}) % {KNUTH_P}) AS h
  FROM documents d
  JOIN qq ON d.doc_id = qq.doc_id
  JOIN rar ra ON d.doc_id = ra.doc_id
), keep AS (
  SELECT source, doc_id, qnum, rarity_e3 FROM (
    SELECT *, row_number() OVER (PARTITION BY source
                                 ORDER BY h, doc_id) AS srk
    FROM uni)
  WHERE srk <= {k}
), prs AS (
  SELECT x.source,
         CAST(sign(x.qnum - y.qnum) AS BIGINT) AS sx,
         CAST(sign(x.rarity_e3 - y.rarity_e3) AS BIGINT) AS sy
  FROM keep x JOIN keep y
    ON x.source = y.source AND x.doc_id < y.doc_id
), agg AS (
  SELECT source, CAST(count(*) AS BIGINT) AS t_pairs,
         CAST(sum(CASE WHEN sx * sy = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS c_pairs,
         CAST(sum(CASE WHEN sx * sy = -1 THEN 1 ELSE 0 END) AS BIGINT)
           AS d_pairs,
         CAST(sum(CASE WHEN sx = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tx,
         CAST(sum(CASE WHEN sy = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ty
  FROM prs GROUP BY 1
)
SELECT source, t_pairs, c_pairs, d_pairs, tx, ty,
       CAST(CASE WHEN t_pairs > tx AND t_pairs > ty THEN
         floor(CAST(c_pairs - d_pairs AS DOUBLE)
               / sqrt(CAST(t_pairs - tx AS DOUBLE)
               * CAST(t_pairs - ty AS DOUBLE)) * 1000000.0)
         ELSE 0 END AS BIGINT) AS tau_b_e6
FROM agg
"""


# Preference-pair constants — MIRRORED in `_preference_pairs_sql`;
# change together.  PREF_K bounds the per-source knuth sample (the
# scorer_agreement/AGREE_K discipline — pairing needs a total rank,
# which is only scale-safe over a bounded set); pairs mirror rank i
# against rank n+1−i so the widest quality gaps pair first.
PREF_K = 200


def q_preference_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DPO/RLHF preference-pair mining — the training-data op that
    turns a scored corpus into (chosen, rejected) pairs: per source,
    rank a bounded sample by the heuristic quality score and pair the
    best against the worst (rank n+1−i vs rank i), emitting both
    doc_ids, both e5 quality numerators, and the pair's margin.
    Downstream a DPO trainer consumes exactly this shape; margin is
    the curriculum/filter knob (pair_rank 1 = widest gap).

    Cross-engine: quality ships as the stable e5 BIGINT numerator
    (the quality_bucket rule); ranks tie-break on doc_id so the
    pairing is total; margin = chosen_q − rejected_q ≥ 0 by
    construction (rank order), exact BIGINT.

    Scale shape: ONE source-partitioned sample window then rank
    windows over the ≤PREF_K-row-per-source sample (few-fat-
    partitions, the exchange reused); the mirror pairing is a
    co-partitioned equi-join on (source, pair_rank)."""
    from pyspark.sql.window import Window

    qnum = F.floor(quality_score() * F.lit(100000.0) + F.lit(0.5)).cast(
        "long"
    )
    uni = _docs(spark, sf_dir).select(
        "source",
        "doc_id",
        qnum.alias("q_e5"),
        knuth_hash(F.col("doc_id")).alias("h"),
    )
    ws = Window.partitionBy("source")
    keep = uni.withColumn(
        "srk", F.row_number().over(ws.orderBy("h", "doc_id"))
    ).where(F.col("srk") <= PREF_K)
    ranked = keep.select(
        "source",
        "doc_id",
        "q_e5",
        F.row_number()
        .over(ws.orderBy("q_e5", "doc_id"))
        .cast("long")
        .alias("rk"),
        F.count(F.lit(1)).over(ws).cast("long").alias("n"),
    )
    lo = ranked.where(F.col("rk") <= F.expr("n DIV 2")).select(
        "source",
        F.col("rk").alias("pair_rank"),
        F.col("doc_id").alias("rejected_id"),
        F.col("q_e5").alias("rejected_q_e5"),
    )
    hi = ranked.where(
        F.expr("n + 1 - rk") <= F.expr("n DIV 2")
    ).select(
        "source",
        F.expr("n + 1 - rk").alias("pair_rank"),
        F.col("doc_id").alias("chosen_id"),
        F.col("q_e5").alias("chosen_q_e5"),
    )
    return lo.join(hi, ["source", "pair_rank"]).select(
        "source",
        "pair_rank",
        "chosen_id",
        "rejected_id",
        "chosen_q_e5",
        "rejected_q_e5",
        (F.col("chosen_q_e5") - F.col("rejected_q_e5")).alias(
            "margin_e5"
        ),
    )


def _preference_pairs_sql() -> str:
    """preference_pairs oracle: the AGREE_K-style knuth sample at
    PREF_K, (q_e5, doc_id) ranks, mirrored rank-i ↔ rank-(n+1−i)
    pairing — all BIGINT."""
    return _TEXT_CTE + f"""
, qq AS (
  SELECT doc_id, CAST(floor(({_QUALITY_SQL}) * 100000 + 0.5) AS BIGINT) AS q_e5
  FROM feats
), uni AS (
  SELECT d.source, q.doc_id, q.q_e5,
         ((d.doc_id % {KNUTH_P}) * {KNUTH_A}) % {KNUTH_P} AS h
  FROM qq q JOIN documents d ON q.doc_id = d.doc_id
), keep AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY source ORDER BY h, doc_id) AS srk
    FROM uni
  ) WHERE srk <= {PREF_K}
), ranked AS (
  SELECT source, doc_id, q_e5,
    CAST(row_number() OVER (PARTITION BY source ORDER BY q_e5, doc_id) AS BIGINT) AS rk,
    CAST(count(*) OVER (PARTITION BY source) AS BIGINT) AS n
  FROM keep
), lo AS (
  SELECT source, rk AS pair_rank, doc_id AS rejected_id,
         q_e5 AS rejected_q_e5
  FROM ranked WHERE rk <= n // 2
), hi AS (
  SELECT source, n + 1 - rk AS pair_rank, doc_id AS chosen_id,
         q_e5 AS chosen_q_e5
  FROM ranked WHERE n + 1 - rk <= n // 2
)
SELECT l.source, l.pair_rank, chosen_id, rejected_id,
       chosen_q_e5, rejected_q_e5,
       chosen_q_e5 - rejected_q_e5 AS margin_e5
FROM lo l JOIN hi h ON l.source = h.source AND l.pair_rank = h.pair_rank
"""


def q_knn_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style embedding clusters END TO END: connected
    components over the MUTUAL kNN edges (`knn_graph`'s high-precision
    subset) — the graph-clustering composition real pipelines run to
    group near-duplicate content semantically, reusing the proven
    min-label propagation from `dedup_clusters` on a different edge
    source.  Output: every vector on a mutual edge with its component
    root and the component size (isolated vectors — no mutual edge —
    are by definition singletons and excluded, mirrored).

    Scale shape: the knn stage is the proven `knn_graph` plan; the
    mutual edge set is N·k-bounded; components run min-label
    propagation with localCheckpoint lineage cuts (iteration count ~
    graph diameter, components here are near-cliques)."""
    from rxtls_spark.operators.cluster import connected_components

    knn = q_knn_graph(spark, sf_dir)
    mutual = (
        knn.where(F.col("mutual") == 1)
        .where(F.col("vec_id") < F.col("nbr_id"))
        .select(
            F.col("vec_id").alias("doc_a"), F.col("nbr_id").alias("doc_b")
        )
        .distinct()
    )
    comp = connected_components(mutual)
    sized = comp.groupBy("cluster_root").agg(
        F.count(F.lit(1)).cast("long").alias("comp_size")
    )
    return comp.join(sized, "cluster_root").select(
        F.col("doc_id").alias("vec_id"), "cluster_root", "comp_size"
    )


def q_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset-card summary — the one-table corpus datasheet (Gebru et
    al. 2021's 'datasheets for datasets' reduced to its quantitative
    rows) a release pipeline publishes next to the data: corpus size,
    source/language breadth, token and character volume, emptiness,
    exact-duplicate mass, and embedding coverage — every value an
    exact BIGINT, every metric a named row so downstream tooling reads
    it as key/value.

    Scale shape: three bounded passes — ONE documents agg (counts +
    distincts + token sum), ONE duplicate-text agg (the dedup_exact
    hash-agg shape), ONE embeddings agg — unioned at metadata scale.
    countDistinct over sources/langs is enum-small; text dups use the
    md5 groupBy, never a self-join."""
    docs = _docs(spark, sf_dir)
    base = docs.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.countDistinct("source").cast("long").alias("n_sources"),
        F.countDistinct("lang").cast("long").alias("n_langs"),
        F.sum(F.length("text")).cast("long").alias("n_chars"),
        F.sum(
            F.when(F.trim("text") == "", 0).otherwise(
                F.size(F.split(F.trim(F.lower(F.col("text"))), "[ \\t\\n\\x0B\\f\\r]+"))
            )
        )
        .cast("long")
        .alias("n_tokens"),
        F.sum((F.trim("text") == "").cast("long"))
        .cast("long")
        .alias("n_empty"),
    )
    dups = (
        docs.groupBy(F.md5("text").alias("h"))
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .agg(
            F.sum(F.col("c") - 1).cast("long").alias("n_exact_dup_docs"),
            F.sum((F.col("c") > 1).cast("long"))
            .cast("long")
            .alias("n_dup_groups"),
        )
    )
    emb = _emb(spark, sf_dir).agg(
        F.count(F.lit(1)).cast("long").alias("n_vectors"),
        F.countDistinct("label").cast("long").alias("n_labels"),
    )
    row = base.crossJoin(dups).crossJoin(emb).first()
    order = [
        "n_docs",
        "n_sources",
        "n_langs",
        "n_chars",
        "n_tokens",
        "n_empty",
        "n_exact_dup_docs",
        "n_dup_groups",
        "n_vectors",
        "n_labels",
    ]
    return spark.createDataFrame(
        [(m, int(row[m])) for m in order], "metric string, value long"
    )


def q_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triplet mining for contrastive embedding training — per anchor
    vector, the most-similar SAME-label neighbor (the positive) and
    the most-similar DIFFERENT-label neighbor (the hard negative),
    with the triplet margin — the table a contrastive trainer consumes
    directly, and the audit that finds label noise (negative margins =
    an other-label vector closer than any same-label one).

    Candidates come from the shared deterministic kmeans quantizer
    (`_kmeans_cents_ctes` consumer — kmeans spec constants flow in),
    exactly the `knn_graph` cell equi-join; ranking is the e5-floored
    cosine with the (cos_e5 DESC, cand) tie-break, the positive/
    negative split is a (anchor, is_pos) window, and anchors missing
    either side (no in-cell same/other-label candidate) drop via the
    inner join — all mirrored.

    Scale shape: identical to `knn_graph` — metadata-scale training,
    map-side assignment, ONE cell equi-join, WindowGroupLimit top-1
    per (anchor, is_pos), then a kNN-output-sized self-join."""
    from pyspark.sql.window import Window

    from rxtls_spark.operators.similarity import (
        cosine_expr,
        ivf_assign_expr,
        train_ivf_centroids,
    )

    emb = _emb(spark, sf_dir)
    cents = train_ivf_centroids(
        emb,
        k=KMEANS_K,
        iters=KMEANS_ITERS,
        metric="l2",
        seed_order=knuth_hash(F.col("vec_id")),
        round_dp=6,
    )
    asg = emb.select(
        "vec_id",
        "embedding",
        F.col("label").cast("long").alias("label"),
        ivf_assign_expr(cents, F.col("embedding"), metric="l2").alias(
            "cell"
        ),
    ).localCheckpoint(eager=False)
    a = asg.select(
        F.col("vec_id").alias("anchor"),
        F.col("embedding").alias("emb_a"),
        F.col("label").alias("lab_a"),
        "cell",
    )
    b = asg.select(
        F.col("vec_id").alias("cand"),
        F.col("embedding").alias("emb_b"),
        F.col("label").alias("lab_b"),
        "cell",
    )
    pairs = (
        a.join(b, "cell")
        .where(F.col("anchor") != F.col("cand"))
        .select(
            "anchor",
            "lab_a",
            "cand",
            (F.col("lab_a") == F.col("lab_b")).cast("int").alias("is_pos"),
            F.floor(cosine_expr("emb_a", "emb_b") * 100000)
            .cast("long")
            .alias("cos_e5"),
        )
    )
    w = Window.partitionBy("anchor", "is_pos").orderBy(
        F.col("cos_e5").desc(), "cand"
    )
    top = pairs.withColumn("rn", F.row_number().over(w)).where(
        F.col("rn") == 1
    )
    pos = top.where(F.col("is_pos") == 1).select(
        "anchor",
        F.col("lab_a").alias("label"),
        F.col("cand").alias("pos_id"),
        F.col("cos_e5").alias("pos_cos_e5"),
    )
    neg = top.where(F.col("is_pos") == 0).select(
        "anchor",
        F.col("cand").alias("neg_id"),
        F.col("cos_e5").alias("neg_cos_e5"),
    )
    return pos.join(neg, "anchor").select(
        "anchor",
        "label",
        "pos_id",
        "pos_cos_e5",
        "neg_id",
        "neg_cos_e5",
        (F.col("pos_cos_e5") - F.col("neg_cos_e5")).alias("margin_e5"),
    )


# OOV-curve vocab grid — MIRRORED in the `oov_curve` oracle SQL;
# change together.  Token rank order is (cnt DESC, tok) — the
# deterministic vocab-building order every tokenizer op in this repo
# uses.
OOV_GRID = (16, 64, 256, 1024, 4096)


def q_oov_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-sizing OOV curve — for each candidate vocab size K,
    the out-of-vocabulary rate a top-K unigram vocab would leave on
    the corpus: the coverage sweep run BEFORE committing a vocab size
    (the unigram complement of `tokenizer_fertility`, which evaluates
    ONE trained BPE vocab).  oov_permille = ((T − cov)·1000) DIV T,
    exact BIGINTs.

    Scale shape: ONE corpus-scale (token) hash agg; the top-max(K)
    ranking is TakeOrderedAndProject (bounded driver merge, the
    corpus_sample plan) and the cumulative sweep runs driver-side over
    ≤ 4096 metadata rows — never a global rank window over the whole
    vocab."""
    docs = _docs(spark, sf_dir).where(F.trim("text") != "")
    cnt = (
        docs.select(F.explode(_lm_tokens()).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    total, n_types = cnt.select(
        F.sum("cnt").cast("long"), F.count(F.lit(1)).cast("long")
    ).first()
    top = [
        r["cnt"]
        for r in cnt.orderBy(F.col("cnt").desc(), "tok")
        .limit(max(OOV_GRID))
        .collect()
    ]
    rows = []
    cum = 0
    k_iter = iter(sorted(OOV_GRID))
    k_next = next(k_iter)
    for i, c in enumerate(top, start=1):
        cum += c
        if i == k_next:
            rows.append((k_next, min(k_next, n_types), cum))
            k_next = next(k_iter, -1)
    for k in sorted(OOV_GRID):
        if k > len(top):
            rows.append((k, min(k, n_types), cum))
    out = spark.createDataFrame(
        [
            (k, nt, cov, (total - cov) * 1000 // total)
            for k, nt, cov in rows
        ],
        "vocab_k long, n_types long, cov_tokens long, oov_permille long",
    )
    return out


# RAKE top-k — MIRRORED in the `rake_keywords` oracle SQL; change
# together.  Word score = (deg·1000) DIV freq (deg = Σ phrase length
# over the word's phrase occurrences, freq = occurrence count — the
# classic degree/frequency ratio favoring words that live in long
# phrases); phrase score = Σ word scores over the phrase's token
# OCCURRENCES.  Stoplist = functions.text.STOPWORDS (already frozen +
# SQL-mirrored).  Candidate phrases are maximal non-stopword runs via
# gaps-and-islands (pos − row_number), identical grouping on both
# engines regardless of 0- vs 1-based positions (a uniform shift
# cancels in the difference).
RAKE_TOPK = 3


def q_rake_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE keyword extraction (Rose et al. 2010) — per-document
    co-occurrence-degree keywords, the UNSUPERVISED complement of
    `tfidf_topterms` (which needs corpus df stats): candidate phrases
    are maximal stopword-free token runs, scored by the sum of their
    words' degree/frequency ratios, top-``RAKE_TOPK`` per doc.  All
    stats are WITHIN-doc, so the operator needs no corpus pass at all.

    Scale shape: every window, groupBy and join keys on doc_id (or
    (doc_id, grp)/(doc_id, tok)) — high-cardinality hash partitions
    that co-locate, no broadcast, no skew risk; the per-doc window
    frames are bounded by document length.  Exact BIGINTs after the
    integer word-score division."""
    from pyspark.sql.window import Window

    from rxtls_spark.functions.text import STOPWORDS

    docs = (
        _docs(spark, sf_dir)
        .where(F.trim("text") != "")
        .select("doc_id", _lm_tokens().alias("t"))
    )
    tok = docs.select("doc_id", F.posexplode("t").alias("pos", "tok"))
    nonstop = tok.where(~F.col("tok").isin(*STOPWORDS))
    wd = Window.partitionBy("doc_id").orderBy("pos")
    grp = nonstop.withColumn(
        "grp", F.col("pos") - F.row_number().over(wd)
    )
    phr = grp.groupBy("doc_id", "grp").agg(
        F.concat_ws(
            " ",
            F.transform(
                F.sort_array(F.collect_list(F.struct("pos", "tok"))),
                lambda s: s["tok"],
            ),
        ).alias("phrase"),
        F.count(F.lit(1)).cast("long").alias("plen"),
    )
    ptok = grp.select("doc_id", "grp", "tok").join(
        phr.select("doc_id", "grp", "plen"), ["doc_id", "grp"]
    )
    wsc = (
        ptok.groupBy("doc_id", "tok")
        .agg(
            F.count(F.lit(1)).cast("long").alias("freq"),
            F.sum("plen").cast("long").alias("deg"),
        )
        .withColumn("wscore", F.expr("(deg * 1000) DIV freq"))
    )
    psc = (
        ptok.join(wsc.select("doc_id", "tok", "wscore"), ["doc_id", "tok"])
        .groupBy("doc_id", "grp")
        .agg(F.sum("wscore").cast("long").alias("score_e3"))
    )
    ph2 = (
        phr.join(psc, ["doc_id", "grp"])
        .groupBy("doc_id", "phrase")
        .agg(
            F.max("plen").cast("long").alias("n_words"),
            F.max("score_e3").cast("long").alias("score_e3"),
            F.count(F.lit(1)).cast("long").alias("n_occ"),
        )
    )
    wr = Window.partitionBy("doc_id").orderBy(
        F.col("score_e3").desc(), "phrase"
    )
    return (
        ph2.withColumn("rk", F.row_number().over(wr).cast("long"))
        .where(F.col("rk") <= RAKE_TOPK)
        .select("doc_id", "phrase", "n_words", "score_e3", "n_occ", "rk")
    )


# Weighted-sample size + the key formula — MIRRORED in the
# `weighted_sample` oracle SQL; change together.  The key is the
# Efraimidis–Spirakis priority ln(u)/w (equivalent to ranking by
# u^(1/w)): u from the knuth hash mapped into (0,1], w from the
# stable e5 quality numerator (+1 so zero-quality docs stay
# sampleable).  Exact-int form: lnu_e6 = floor(ln((h+1)/(P+1)) · 1e6)
# ≤ 0, key_e = (lnu_e6 · 100000) DIV w_e5 — both engines truncate
# integer division toward zero, so the quotient (and hence the whole
# ranking) matches exactly.
WSAMPLE_K = 200


def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-weighted sampling WITHOUT replacement (Efraimidis &
    Spirakis 2006, the one-pass weighted-reservoir trick): every doc
    draws a deterministic priority key ln(u)/w and the global top-K
    keys are the sample — inclusion probability ∝ quality weight, no
    two-pass normalization, trivially distributed.  This is the
    missing third sampling mode beside `mixture_sample` (per-group
    rates) and `corpus_sample` (uniform): proportional-to-weight.

    Scale shape: pure per-row key computation (0 exchanges) + global
    top-K — TakeOrderedAndProject, the `corpus_sample` plan; K is
    metadata-scale so the driver merge is bounded."""
    docs = _docs(spark, sf_dir)
    qnum = F.floor(quality_score() * F.lit(100000.0) + F.lit(0.5)).cast(
        "long"
    )
    keyed = docs.select(
        "doc_id",
        (qnum + F.lit(1)).alias("w_e5"),
        F.floor(
            F.log(
                (knuth_hash(F.col("doc_id")) + F.lit(1)).cast("double")
                / F.lit(float(KNUTH_P + 1))
            )
            * 1000000.0
        )
        .cast("long")
        .alias("lnu_e6"),
    ).withColumn("key_e", F.expr("(lnu_e6 * 100000) DIV w_e5"))
    return (
        keyed.select("doc_id", "w_e5", "key_e")
        .orderBy(F.col("key_e").desc(), "doc_id")
        .limit(WSAMPLE_K)
    )


# Secret/credential-scan spec — MIRRORED in `_secret_scan_sql`; change
# together.  Injection: every doc_id % SECRET_MOD == SECRET_REM doc
# gets three synthetic credentials appended, each derived from
# md5(doc_id) so BOTH engines can rebuild them exactly (the
# with_injected_pii discipline): an AWS-style access key
# 'AKIA'+upper-hex16, a 64-char hex token, and a mixed-case
# base64-alphabet token whose '9zZ+/' tail GUARANTEES the
# digit/lower/upper entropy proxy fires.  Token classification is
# FIRST-MATCH in the order aws → hex → b64 (the filter_cascade CASE
# discipline): the b64 candidate class [A-Za-z0-9+/]{20,} is a
# SUPERSET of both others, so candidate counts must exclude them.
# Verdict CASE order IS the semantics: block beats review.
SECRET_MOD = 8
SECRET_REM = 3
_P_AWS = "^AKIA[0-9A-Z]{16}$"
_P_HEX = "^[0-9a-f]{32,}$"
_P_B64 = "^[A-Za-z0-9+/]{20,}$"


def _secret_lams() -> dict[str, str]:
    """The shared per-token classification predicates — ONE Python
    helper whose pattern text is spliced into BOTH engines (the
    `_ndcg_weights` rule for regex; Java and RE2 agree on these
    anchored char-class-only patterns)."""
    aws = f"x rlike '{_P_AWS}'"
    hx = f"x rlike '{_P_HEX}'"
    cand = f"(x rlike '{_P_B64}' AND NOT ({aws}) AND NOT ({hx}))"
    conf = (
        f"({cand} AND x rlike '[0-9]' AND x rlike '[a-z]'"
        " AND x rlike '[A-Z]')"
    )
    return {"aws": aws, "hex": hx, "cand": cand, "conf": conf}


def q_secret_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """High-entropy secret / credential scan — the scrub gate every
    web-scale training corpus runs before release (leaked API keys and
    tokens are verbatim-memorizable and revocation-sensitive): per-doc
    counts of AWS-style access keys, long hex tokens, and
    entropy-confirmed base64-alphabet candidates, a block/review/clean
    verdict, and the md5 of the redacted text (typed placeholders, the
    `pii_scrub` convention).  The mixed-character-class check
    (digit + lower + upper) is the deterministic stand-in for a
    Shannon-entropy gate — it separates secrets from ordinary long
    words without a float anywhere.

    Cross-engine: injected credentials are md5(doc_id)-derived string
    formulas; classification is first-match over anchored
    char-class-only patterns identical in Java regex and RE2; counts
    are BIGINT; scrub output is compared as md5.

    Scale shape: pure per-row array map over the token split — zero
    exchanges, the `pii_scrub` plan."""
    docs = (
        _docs(spark, sf_dir)
        .select("doc_id", "text")
        .where(F.trim("text") != "")
    )
    h1 = "md5(CAST(doc_id AS STRING))"
    h2 = "md5(CAST(doc_id + 1 AS STRING))"
    inj = (
        f"concat(text, ' AKIA', upper(substring({h1}, 1, 16)), ' ', "
        f"{h1}, {h2}, ' ', substring({h1}, 1, 10), "
        f"upper(substring({h2}, 1, 10)), '9zZ+/')"
    )
    d = docs.withColumn(
        "text",
        F.expr(
            f"CASE WHEN doc_id % {SECRET_MOD} = {SECRET_REM}"
            f" THEN {inj} ELSE text END"
        ),
    ).withColumn(
        "t", F.split(F.trim(F.col("text")), "[ \\t\\n\\x0B\\f\\r]+")
    )
    p = _secret_lams()
    scrub = (
        f"transform(t, x -> CASE WHEN {p['aws']} THEN '<AWSKEY>'"
        f" WHEN {p['hex']} THEN '<HEX>'"
        f" WHEN {p['conf']} THEN '<B64>' ELSE x END)"
    )
    c = d.select(
        "doc_id",
        F.expr(f"size(filter(t, x -> {p['aws']}))").cast("long").alias(
            "n_aws"
        ),
        F.expr(f"size(filter(t, x -> {p['hex']}))").cast("long").alias(
            "n_hex"
        ),
        F.expr(f"size(filter(t, x -> {p['cand']}))").cast("long").alias(
            "n_b64_cand"
        ),
        F.expr(f"size(filter(t, x -> {p['conf']}))").cast("long").alias(
            "n_b64_conf"
        ),
        F.md5(F.expr(f"concat_ws(' ', {scrub})")).alias("scrubbed_md5"),
    )
    return c.select(
        "doc_id",
        "n_aws",
        "n_hex",
        "n_b64_cand",
        "n_b64_conf",
        F.when(
            F.col("n_aws") + F.col("n_hex") + F.col("n_b64_conf") > 0,
            F.lit("block"),
        )
        .when(F.col("n_b64_cand") > 0, F.lit("review"))
        .otherwise(F.lit("clean"))
        .alias("verdict"),
        "scrubbed_md5",
    )


def _secret_scan_sql() -> str:
    """secret_scan oracle: identical md5-derived injection, the same
    spliced first-match predicates (rlike → regexp_matches), BIGINT
    counts, identical verdict CASE order, md5 of the identically
    rebuilt scrubbed text."""
    # the predicate texts for RE2 (identical pattern constants)
    aws = f"regexp_matches(x, '{_P_AWS}')"
    hx = f"regexp_matches(x, '{_P_HEX}')"
    cand = f"(regexp_matches(x, '{_P_B64}') AND NOT {aws} AND NOT {hx})"
    conf = (
        f"({cand} AND regexp_matches(x, '[0-9]')"
        " AND regexp_matches(x, '[a-z]')"
        " AND regexp_matches(x, '[A-Z]'))"
    )
    scrub = (
        f"list_transform(t, x -> CASE WHEN {aws} THEN '<AWSKEY>'"
        f" WHEN {hx} THEN '<HEX>'"
        f" WHEN {conf} THEN '<B64>' ELSE x END)"
    )
    return f"""
WITH base AS (
  SELECT doc_id, text FROM documents WHERE trim(text) <> ''
), inj AS (
  SELECT doc_id,
    CASE WHEN doc_id % {SECRET_MOD} = {SECRET_REM} THEN
      text || ' AKIA' || upper(substr(md5(CAST(doc_id AS VARCHAR)), 1, 16))
        || ' ' || md5(CAST(doc_id AS VARCHAR))
        || md5(CAST(doc_id + 1 AS VARCHAR))
        || ' ' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 10)
        || upper(substr(md5(CAST(doc_id + 1 AS VARCHAR)), 1, 10))
        || '9zZ+/'
    ELSE text END AS text
  FROM base
), tt AS (
  SELECT doc_id,
         regexp_split_to_array(trim(text), '[ \\t\\n\\x0B\\f\\r]+') AS t
  FROM inj
), c AS (
  SELECT doc_id,
    CAST(len(list_filter(t, x -> {aws})) AS BIGINT) AS n_aws,
    CAST(len(list_filter(t, x -> {hx})) AS BIGINT) AS n_hex,
    CAST(len(list_filter(t, x -> {cand})) AS BIGINT) AS n_b64_cand,
    CAST(len(list_filter(t, x -> {conf})) AS BIGINT) AS n_b64_conf,
    md5(array_to_string({scrub}, ' ')) AS scrubbed_md5
  FROM tt
)
SELECT doc_id, n_aws, n_hex, n_b64_cand, n_b64_conf,
  CASE WHEN n_aws + n_hex + n_b64_conf > 0 THEN 'block'
       WHEN n_b64_cand > 0 THEN 'review'
       ELSE 'clean' END AS verdict,
  scrubbed_md5
FROM c
"""


# Isotonic-calibration spec — MIRRORED in `_isotonic_sql`; change
# together.  ISO_BINS probability bins of width ISO_W over the
# e3-floored GD probability (another `_logreg_ctes` consumer — logreg
# constants flow in); the fit is the MINIMAX form of isotonic
# regression, max_{j≤i} min_{k≥i} rate(j,k), on e9-floored BIGINT
# pooled rates — equivalent to PAVA on the reals (pytest proves the
# floored forms agree to 1 ulp) but expressible as pure joins/aggs in
# BOTH engines, no sequential pooling stack anywhere.
ISO_BINS = 25
ISO_W = 40  # 1000 DIV ISO_BINS


def _iso_minimax(rows: list[tuple[int, int, int]]) -> list[int]:
    """Exact-integer minimax isotonic fit over bin-sorted
    (bin, n, pos) rows: iso_i = max_{j≤i} min_{k≥i} of the e9-floored
    pooled rate of the block [j..k] — the SAME truncating-DIV
    arithmetic the oracle's join form computes (positive operands)."""
    cn, cp = [0], [0]
    for _b, n, pos in rows:
        cn.append(cn[-1] + n)
        cp.append(cp[-1] + pos)
    nb = len(rows)

    def rate(j: int, k: int) -> int:
        return ((cp[k] - cp[j - 1]) * 10**9) // (cn[k] - cn[j - 1])

    return [
        max(
            min(rate(j, k) for k in range(i, nb + 1))
            for j in range(1, i + 1)
        )
        for i in range(1, nb + 1)
    ]


def q_isotonic_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Isotonic (PAVA) probability calibration of the trained quality
    classifier — the non-parametric recalibration map (Zadrozny &
    Elkan 2002) a pipeline fits when the reliability diagram
    (`calibration_bins`) shows miscalibration: per probability bin,
    the raw positive rate and the monotone-regularized isotonic rate
    (pool-adjacent-violators), the lookup table inference applies.
    Completes the calibration family: `calibration_bins` diagnoses,
    `brier_decomp` attributes, `conformal_coverage` guarantees, this
    FIXES.

    Cross-engine: the fit is the minimax identity (max-min of pooled
    block rates) on e9-floored BIGINT rates — Spark computes it in
    exact Python ints over the COLLECTED ≤ISO_BINS-row histogram (the
    bradley_terry driver-literal precedent), DuckDB as bounded
    self-joins; identical truncating DIVs, bit-equal by construction.

    Scale shape: pure-map scoring → ONE ≤ISO_BINS-row hash agg; the
    O(B³) minimax runs on the bounded bin table, never on the
    corpus."""
    fx = logreg_features(_docs(spark, sf_dir))
    _, wv = _logreg_train(fx)
    m = (
        F.lit(wv[0]) * F.lit(1.0)
        + F.lit(wv[1]) * F.col("x1")
        + F.lit(wv[2]) * F.col("x2")
        + F.lit(wv[3]) * F.col("x3")
    )
    p = F.lit(1.0) / (F.lit(1.0) + F.exp(-m))
    scored = fx.select(
        F.floor(p * F.lit(1000.0) + F.lit(0.5)).cast("long").alias("p_e3"),
        F.col("y").cast("long").alias("y_l"),
    )
    hist = (
        scored.select(
            F.least(F.expr(f"p_e3 DIV {ISO_W}"), F.lit(ISO_BINS - 1))
            .cast("long")
            .alias("bin"),
            "y_l",
        )
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("y_l").cast("long").alias("n_pos"),
        )
        .collect()
    )
    rows = sorted((r["bin"], r["n"], r["n_pos"]) for r in hist)
    iso = _iso_minimax(rows)
    out = [
        (b, n, pos, (pos * 10**9) // n, iso[i])
        for i, (b, n, pos) in enumerate(rows)
    ]
    return spark.createDataFrame(
        out,
        "bin long, n long, n_pos long, rate_e9 long, iso_e9 long",
    )


def _isotonic_sql(iters: int = LOGREG_ITERS, lr: float = LOGREG_LR) -> str:
    """isotonic_fit oracle: the shared GD chain to p_e3, the ISO bin
    histogram, then the minimax fit as bounded self-joins over the
    bin table (prefix sums via distinct-key ORDER BY windows — the
    roc_auc RANGE-frame rule)."""
    parts = _logreg_ctes(iters, lr)
    m = "(w.w0 * 1.0 + w.w1 * x1 + w.w2 * x2 + w.w3 * x3)"
    p = f"(1.0 / (1.0 + exp(-{m})))"
    return (
        "WITH "
        + ",\n".join(parts)
        + f""",
iso_scored AS (
  SELECT CAST(floor({p} * 1000 + 0.5) AS BIGINT) AS p_e3,
         CAST(y AS BIGINT) AS y_l
  FROM fx, w{iters} w
), binned AS MATERIALIZED (
  SELECT CAST(least(p_e3 // {ISO_W}, {ISO_BINS - 1}) AS BIGINT) AS bin,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(y_l) AS BIGINT) AS n_pos
  FROM iso_scored GROUP BY 1
), ord AS MATERIALIZED (
  SELECT bin, n, n_pos,
         row_number() OVER (ORDER BY bin) AS rn,
         CAST(sum(n) OVER (ORDER BY bin) AS BIGINT) AS cn,
         CAST(sum(n_pos) OVER (ORDER BY bin) AS BIGINT) AS cp
  FROM binned
), rjk AS MATERIALIZED (
  SELECT j.rn AS j, k.rn AS k,
         ((k.cp - coalesce(jm.cp, 0)) * 1000000000)
           // (k.cn - coalesce(jm.cn, 0)) AS r
  FROM ord j
  JOIN ord k ON k.rn >= j.rn
  LEFT JOIN ord jm ON jm.rn = j.rn - 1
), mn AS (
  SELECT i.rn AS i, r.j, min(r.r) AS mr
  FROM ord i JOIN rjk r ON r.j <= i.rn AND r.k >= i.rn
  GROUP BY 1, 2
), f AS (
  SELECT i, CAST(max(mr) AS BIGINT) AS iso_e9 FROM mn GROUP BY 1
)
SELECT o.bin, o.n, o.n_pos,
       (o.n_pos * 1000000000) // o.n AS rate_e9,
       f.iso_e9
FROM ord o JOIN f ON o.rn = f.i
"""
    )


# DBSCAN spec — MIRRORED in `_dbscan_sql`; change together.  Another
# `_kmeans_cents_ctes` consumer (kmeans constants flow in): the
# ε-neighborhood is IN-CELL cosine ≥ DBSCAN_TAU_E5 on the e5-floored
# BIGINT (the knn_graph candidate restriction — blocked DBSCAN), core
# = ≥ DBSCAN_MIN_PTS neighbors (excluding self — classical minPts−1),
# clusters = components over core–core ε-edges, border points take the
# MIN cluster root among their core neighbors, noise is excluded on
# both sides.
DBSCAN_TAU_E5 = 25000
DBSCAN_MIN_PTS = 4


def q_dbscan_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Density-based clustering (DBSCAN, Ester et al. 1996) over the
    embedding space — the clustering family's density member next to
    `kmeans` (partitional) and `knn_components` (graph): core points
    are vectors with ≥ ``DBSCAN_MIN_PTS`` ε-neighbors (cosine ≥
    ``DBSCAN_TAU_E5``), clusters are connected components of the
    core–core ε-graph, border points attach to the MIN cluster root
    among their core neighbors (the deterministic form of DBSCAN's
    order-dependent border assignment), and noise — neither core nor
    border — is excluded on both sides.  Output per member: role flag,
    cluster root, and the cluster's core/member counts — the table a
    curation pipeline reads to drop noise docs and sample per density
    cluster.

    Candidates come from the SAME deterministic kmeans quantizer as
    `knn_graph` / `semantic_dedup` (cell equi-join — blocked DBSCAN,
    never an all-pairs corpus join; the ε-graph within a cell is the
    production approximation real pipelines run, and the blocking is
    part of the mirrored spec).  All outputs BIGINT; the e5-floored
    cosine makes the ε-test exact cross-engine.

    Scale shape: training metadata-scale; assignment a pure map; ONE
    cell equi-join filtered to ε-pairs (the selective predicate is
    applied inside the join project); degree count is a hash agg;
    components run the proven min-label propagation (near-clique
    diameter); border assignment is one ε-edge join + min-agg.
    Reference analog: the corpus-level clustering extension of P8
    (/root/reference/internal/core/domain_extractor.go:520-545 keeps
    first-seen only; clusters are the 100 TB curation need)."""
    from rxtls_spark.operators.cluster import connected_components
    from rxtls_spark.operators.similarity import (
        cosine_expr,
        ivf_assign_expr,
        train_ivf_centroids,
    )

    emb = _emb(spark, sf_dir)
    cents = train_ivf_centroids(
        emb,
        k=KMEANS_K,
        iters=KMEANS_ITERS,
        metric="l2",
        seed_order=knuth_hash(F.col("vec_id")),
        round_dp=6,
    )
    asg = emb.select(
        "vec_id",
        "embedding",
        ivf_assign_expr(cents, F.col("embedding"), metric="l2").alias(
            "cell"
        ),
    ).localCheckpoint(eager=False)  # assign once for both join sides
    a = asg.select(
        F.col("vec_id").alias("src"),
        F.col("embedding").alias("emb_a"),
        "cell",
    )
    b = asg.select(
        F.col("vec_id").alias("nbr"),
        F.col("embedding").alias("emb_b"),
        "cell",
    )
    # ε-pairs (both directions) — reused by degree, core edges, border
    pairs = (
        a.join(b, "cell")
        .where(F.col("src") != F.col("nbr"))
        .select(
            "src",
            "nbr",
            F.floor(cosine_expr("emb_a", "emb_b") * 100000)
            .cast("long")
            .alias("cos_e5"),
        )
        .where(F.col("cos_e5") >= DBSCAN_TAU_E5)
        .select("src", "nbr")
        .localCheckpoint(eager=False)
    )
    core = (
        pairs.groupBy("src")
        .agg(F.count(F.lit(1)).alias("deg"))
        .where(F.col("deg") >= DBSCAN_MIN_PTS)
        .select(F.col("src").alias("vec_id"))
        .localCheckpoint(eager=False)
    )
    ce = (
        pairs.join(core.select(F.col("vec_id").alias("src")), "src")
        .join(core.select(F.col("vec_id").alias("nbr")), "nbr")
        .where(F.col("src") < F.col("nbr"))
        .select(F.col("src").alias("doc_a"), F.col("nbr").alias("doc_b"))
        .distinct()
    )
    cc = connected_components(ce).withColumnRenamed("doc_id", "vec_id")
    # isolated cores (no core neighbor) are singleton clusters
    core_cc = core.join(cc, "vec_id", "left").select(
        "vec_id",
        F.coalesce("cluster_root", F.col("vec_id")).alias("cluster_root"),
    )
    border = (
        pairs.join(
            core_cc.select(
                F.col("vec_id").alias("nbr"),
                F.col("cluster_root").alias("nbr_root"),
            ),
            "nbr",
        )
        .join(
            core.select(F.col("vec_id").alias("src")), "src", "left_anti"
        )
        .groupBy("src")
        .agg(F.min("nbr_root").alias("cluster_root"))
        .select(F.col("src").alias("vec_id"), "cluster_root")
    )
    mem = core_cc.withColumn("is_core", F.lit(1).cast("long")).unionByName(
        border.withColumn("is_core", F.lit(0).cast("long"))
    )
    sz = mem.groupBy("cluster_root").agg(
        F.sum("is_core").cast("long").alias("n_core"),
        F.count(F.lit(1)).cast("long").alias("n_member"),
    )
    return mem.join(sz, "cluster_root").select(
        "vec_id", "is_core", "cluster_root", "n_core", "n_member"
    )


def _dbscan_sql(
    k: int = KMEANS_K,
    iters: int = KMEANS_ITERS,
    dim: int = KMEANS_DIM,
    tau: int = DBSCAN_TAU_E5,
    min_pts: int = DBSCAN_MIN_PTS,
) -> str:
    """dbscan_clusters oracle: the shared unrolled-Lloyd's centroid
    CTEs, identical assignment, in-cell ε-pairs on the e5-floored
    cosine (MATERIALIZED — consumed three times), the HAVING-degree
    core set, the dedup_clusters WITH RECURSIVE min-label closure over
    core–core edges, min-root border attachment, and BIGINT member
    counts."""
    ctes = _kmeans_cents_ctes(k, iters, dim)
    return (
        "WITH RECURSIVE "
        + ",\n".join(ctes)
        + f""",
asg AS (
  SELECT vec_id, emb, cell FROM (
    SELECT e.vec_id, e.emb, c.cell,
      row_number() OVER (PARTITION BY e.vec_id
                         ORDER BY list_distance(e.emb, c.centroid), c.cell
      ) AS rn
    FROM e, cents{iters} c)
  WHERE rn = 1
), p AS MATERIALIZED (
  SELECT a.vec_id AS src, b.vec_id AS nbr
  FROM asg a JOIN asg b ON a.cell = b.cell AND a.vec_id <> b.vec_id
  WHERE CAST(floor(list_cosine_similarity(a.emb, b.emb) * 100000)
             AS BIGINT) >= {tau}
), core AS MATERIALIZED (
  SELECT src AS vec_id FROM p GROUP BY 1 HAVING count(*) >= {min_pts}
), ce AS (
  SELECT p.src AS a, p.nbr AS b
  FROM p
  JOIN core ca ON p.src = ca.vec_id
  JOIN core cb ON p.nbr = cb.vec_id
  WHERE p.src < p.nbr
), edges AS (
  SELECT a, b FROM ce UNION SELECT b, a FROM ce
), nodes AS (
  SELECT DISTINCT a AS vec_id FROM edges
), reach(vec_id, label) AS (
  SELECT vec_id, vec_id FROM nodes
  UNION
  SELECT e.a, r.label FROM edges e JOIN reach r ON e.b = r.vec_id
), cc AS (
  SELECT vec_id, min(label) AS cluster_root FROM reach GROUP BY 1
), core_cc AS MATERIALIZED (
  SELECT c.vec_id, coalesce(cc.cluster_root, c.vec_id) AS cluster_root
  FROM core c LEFT JOIN cc ON cc.vec_id = c.vec_id
), border AS (
  SELECT p.src AS vec_id, min(k.cluster_root) AS cluster_root
  FROM p JOIN core_cc k ON p.nbr = k.vec_id
  WHERE p.src NOT IN (SELECT vec_id FROM core)
  GROUP BY 1
), mem AS (
  SELECT vec_id, CAST(1 AS BIGINT) AS is_core, cluster_root FROM core_cc
  UNION ALL
  SELECT vec_id, CAST(0 AS BIGINT) AS is_core, cluster_root FROM border
), sz AS (
  SELECT cluster_root, CAST(sum(is_core) AS BIGINT) AS n_core,
         CAST(count(*) AS BIGINT) AS n_member
  FROM mem GROUP BY 1
)
SELECT m.vec_id, m.is_core, m.cluster_root, s.n_core, s.n_member
FROM mem m JOIN sz s USING (cluster_root)
"""
    )


# Platt-scaling spec — MIRRORED in `_platt_sql`; change together.
# Another `_logreg_ctes` + `ISO_BINS/ISO_W` consumer (logreg constants
# and the isotonic bin rule flow in): a 2-parameter NEWTON fit of
# σ(A·x + B) on x = p_e3/1000 (the e3-floored base probability — an
# exact rational double both engines).  Plain GD is useless here (the
# base scores span ~0.1 in x, so the A-gradient is tiny and hundreds
# of steps still underfit — measured); Newton (Platt 1999's own
# second-order fit) converges to the fixpoint in ≤6 steps.  Per step
# the FIVE mean statistics (mgx, mg, mxx, mhx, mh) are 6-dp
# floor-stable on both engines, and the 2×2 solve
# det = (mxx·mh − mhx·mhx), a −= (mh·mgx − mhx·mg)/det,
# b −= (mxx·mg − mhx·mgx)/det is the IDENTICAL expression text — so
# (A, B) evolve as identical doubles (the _logreg_train discipline,
# second-order form).  Evaluation at each bin MIDPOINT mid_e3 =
# bin·ISO_W + ISO_W DIV 2 with the e3-floored σ (exp once per bin —
# the p_e3 ulp-absorption rule).
PLATT_ITERS = 8


def q_platt_scaling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Platt scaling (Platt 1999) of the trained quality classifier —
    the PARAMETRIC recalibration map next to `isotonic_fit`'s
    non-parametric one (the classic pairing: Platt for small/smooth
    miscalibration, isotonic when the reliability curve is lumpy):
    fit σ(A·x + B) on the base model's probability by deterministic
    full-batch GD, then emit per probability bin the raw positive
    rate and the Platt-calibrated value at the bin midpoint — the
    lookup table inference applies, directly comparable row-for-row
    with `isotonic_fit`'s.

    Cross-engine: x = p_e3/1000 is an exact rational double; each
    NEWTON step's five mean statistics are 6-dp floor-stable on BOTH
    engines and the 2×2 solve is the identical expression text, so
    (A, B) evolve as identical doubles (the `_logreg_train`
    discipline, second-order form — see the spec comment for why
    first-order GD cannot fit this data); the per-bin output floors
    σ at e3 — exp() appears once per BIN, and the e3 floor absorbs
    engine exp() ulp drift (the p_e3 rule).

    Scale shape: base scoring is a pure map; the Platt fit is one
    5-scalar hash agg per iteration (the kmeans/logreg loop shape —
    driver state is 2 floats); the output is ONE bounded ≤ISO_BINS
    hash agg with the calibrated column a pure expression on
    literals."""
    import math

    fx = logreg_features(_docs(spark, sf_dir))
    _, wv = _logreg_train(fx)
    m = (
        F.lit(wv[0]) * F.lit(1.0)
        + F.lit(wv[1]) * F.col("x1")
        + F.lit(wv[2]) * F.col("x2")
        + F.lit(wv[3]) * F.col("x3")
    )
    p = F.lit(1.0) / (F.lit(1.0) + F.exp(-m))
    scored = fx.select(
        F.floor(p * F.lit(1000.0) + F.lit(0.5)).cast("long").alias("p_e3"),
        F.col("y").cast("long").alias("y_l"),
    ).localCheckpoint(eager=False)  # feeds every GD step + the bin agg
    px = scored.select(
        (F.col("p_e3").cast("double") / F.lit(1000.0)).alias("x"),
        F.col("y_l").cast("double").alias("y"),
    )
    a, b = 0.0, 0.0
    for _it in range(PLATT_ITERS):
        s = F.lit(1.0) / (
            F.lit(1.0) + F.exp(-(F.lit(a) * F.col("x") + F.lit(b)))
        )
        hw = s * (F.lit(1.0) - s)
        agg = px.agg(
            F.sum((s - F.col("y")) * F.col("x")).alias("gx"),
            F.sum(s - F.col("y")).alias("g"),
            F.sum(hw * F.col("x") * F.col("x")).alias("hxx"),
            F.sum(hw * F.col("x")).alias("hx"),
            F.sum(hw).alias("h"),
            F.count(F.lit(1)).alias("n"),
        ).collect()[0]
        n = float(agg["n"])
        mgx, mg, mxx, mhx, mh = (
            math.floor(agg[c] / n * 1e6 + 0.5) / 1e6
            for c in ("gx", "g", "hxx", "hx", "h")
        )
        # the 2x2 Newton solve — expression text mirrored in _platt_sql
        det = mxx * mh - mhx * mhx
        a = a - (mh * mgx - mhx * mg) / det
        b = b - (mxx * mg - mhx * mgx) / det
    mid = (
        F.col("bin") * F.lit(ISO_W) + F.lit(ISO_W // 2)
    ).cast("long")
    xm = mid.cast("double") / F.lit(1000.0)
    platt = F.lit(1.0) / (
        F.lit(1.0) + F.exp(-(F.lit(a) * xm + F.lit(b)))
    )
    return (
        scored.select(
            F.least(
                F.expr(f"p_e3 DIV {ISO_W}"), F.lit(ISO_BINS - 1)
            )
            .cast("long")
            .alias("bin"),
            "y_l",
        )
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("y_l").cast("long").alias("n_pos"),
        )
        .select(
            "bin",
            "n",
            "n_pos",
            F.expr("(n_pos * 1000000000) DIV n").cast("long").alias("rate_e9"),
            mid.alias("mid_e3"),
            F.floor(platt * F.lit(1000.0) + F.lit(0.5))
            .cast("long")
            .alias("platt_e3"),
        )
    )


def _platt_sql(
    iters: int = LOGREG_ITERS,
    lr: float = LOGREG_LR,
    p_iters: int = PLATT_ITERS,
) -> str:
    """platt_scaling oracle: the shared GD chain to p_e3, the unrolled
    2-parameter NEWTON chain (pa0..pa{p_iters}) with 6-dp floor-stable
    mean statistics and the mirrored 2×2 solve, and the bounded bin
    table with the e3-floored midpoint sigmoid."""
    parts = _logreg_ctes(iters, lr)
    m = "(w.w0 * 1.0 + w.w1 * x1 + w.w2 * x2 + w.w3 * x3)"
    p = f"(1.0 / (1.0 + exp(-{m})))"
    parts.append(
        f"""px AS MATERIALIZED (
  SELECT CAST(floor({p} * 1000 + 0.5) AS BIGINT) AS p_e3,
         CAST(floor({p} * 1000 + 0.5) AS BIGINT) / 1000.0 AS x,
         y
  FROM fx, w{iters} w
), pa0 AS (SELECT 0.0 AS a, 0.0 AS b)"""
    )
    for it in range(1, p_iters + 1):
        s = "(1.0 / (1.0 + exp(-(w.a * x + w.b))))"
        hw = f"({s} * (1.0 - {s}))"
        parts.append(
            f"""pg{it} AS (
  SELECT
    floor(sum(({s} - y) * x) / count(*) * 1000000 + 0.5) / 1000000 AS mgx,
    floor(sum({s} - y) / count(*) * 1000000 + 0.5) / 1000000 AS mg,
    floor(sum({hw} * x * x) / count(*) * 1000000 + 0.5) / 1000000 AS mxx,
    floor(sum({hw} * x) / count(*) * 1000000 + 0.5) / 1000000 AS mhx,
    floor(sum({hw}) / count(*) * 1000000 + 0.5) / 1000000 AS mh
  FROM px, pa{it - 1} w
), pa{it} AS (
  SELECT
    w.a - (g.mh * g.mgx - g.mhx * g.mg)
          / (g.mxx * g.mh - g.mhx * g.mhx) AS a,
    w.b - (g.mxx * g.mg - g.mhx * g.mgx)
          / (g.mxx * g.mh - g.mhx * g.mhx) AS b
  FROM pa{it - 1} w, pg{it} g
)"""
        )
    return (
        "WITH "
        + ",\n".join(parts)
        + f""",
binned AS (
  SELECT CAST(least(p_e3 // {ISO_W}, {ISO_BINS - 1}) AS BIGINT) AS bin,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(y AS BIGINT)) AS BIGINT) AS n_pos
  FROM px GROUP BY 1
)
SELECT bin, n, n_pos,
       (n_pos * 1000000000) // n AS rate_e9,
       CAST(bin * {ISO_W} + {ISO_W // 2} AS BIGINT) AS mid_e3,
       CAST(floor(
         (1.0 / (1.0 + exp(-(w.a * (CAST(bin * {ISO_W} + {ISO_W // 2}
                                    AS BIGINT) / 1000.0) + w.b))))
         * 1000 + 0.5) AS BIGINT) AS platt_e3
FROM binned, pa{p_iters} w
"""
    )


def q_confident_learning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confident-learning label-noise audit (Northcutt et al. 2021) —
    the data-CLEANING canon's estimator of the label↔prediction joint:
    per-class confidence thresholds t_j = mean self-confidence of
    docs LABELED j, then every doc whose (anti-)confidence clears a
    threshold is counted into the confident joint C[label][pred]; the
    off-diagonal cells estimate how many labels are WRONG — the
    number a curation team reads before trusting `lang_guess`-style
    weak labels for training.  Completes the label-quality family:
    `cartography` (training dynamics), `uncertainty_sample`
    (boundary), this (systematic noise estimate).

    Binary form on the trained quality classifier (another
    `_logreg_ctes` consumer — logreg constants flow in): confidence
    of class 1 is the e3-floored p_e3, of class 0 is 1000−p_e3;
    thresholds are truncating-DIV means of those BIGINTs over each
    label slice; pred = 1 if p_e3 ≥ t1 (and not class 0), 0 if
    1000−p_e3 ≥ t0 (and not class 1), the argmax rule p_e3 ≥ 500
    breaks double-qualifiers (ties → 1, mirrored CASE order), and
    docs clearing neither threshold are excluded (Northcutt's rule).
    All outputs BIGINT.

    Scale shape: scoring is a pure map; thresholds are ONE 2-slice
    hash agg shipped back as literals; the joint is ONE ≤4-row hash
    agg — no joins, no windows."""
    fx = logreg_features(_docs(spark, sf_dir))
    _, wv = _logreg_train(fx)
    m = (
        F.lit(wv[0]) * F.lit(1.0)
        + F.lit(wv[1]) * F.col("x1")
        + F.lit(wv[2]) * F.col("x2")
        + F.lit(wv[3]) * F.col("x3")
    )
    p = F.lit(1.0) / (F.lit(1.0) + F.exp(-m))
    scored = fx.select(
        F.floor(p * F.lit(1000.0) + F.lit(0.5)).cast("long").alias("p_e3"),
        F.col("y").cast("long").alias("label"),
    ).localCheckpoint(eager=False)  # feeds thresholds + the joint
    thr = scored.agg(
        F.expr(
            "sum(CASE WHEN label = 1 THEN p_e3 ELSE 0 END)"
            " DIV sum(CASE WHEN label = 1 THEN 1 ELSE 0 END)"
        ).alias("t1"),
        F.expr(
            "sum(CASE WHEN label = 0 THEN 1000 - p_e3 ELSE 0 END)"
            " DIV sum(CASE WHEN label = 0 THEN 1 ELSE 0 END)"
        ).alias("t0"),
    ).collect()[0]
    t1, t0 = int(thr["t1"]), int(thr["t0"])
    pred = (
        F.when(
            (F.col("p_e3") >= t1) & (F.lit(1000) - F.col("p_e3") >= t0),
            F.when(F.col("p_e3") >= 500, F.lit(1)).otherwise(F.lit(0)),
        )
        .when(F.col("p_e3") >= t1, F.lit(1))
        .when(F.lit(1000) - F.col("p_e3") >= t0, F.lit(0))
        .cast("long")
    )
    return (
        scored.withColumn("pred", pred)
        .where(F.col("pred").isNotNull())
        .groupBy("label", "pred")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
        .select(
            "label",
            "pred",
            "n_docs",
            F.lit(t1).cast("long").alias("t1_e3"),
            F.lit(t0).cast("long").alias("t0_e3"),
        )
    )


def _confident_learning_sql(
    iters: int = LOGREG_ITERS, lr: float = LOGREG_LR
) -> str:
    """confident_learning oracle: the shared GD chain to p_e3, the
    two truncating-DIV threshold means, and the mirrored
    qualify/argmax CASE — the CASE order IS the semantics."""
    parts = _logreg_ctes(iters, lr)
    m = "(w.w0 * 1.0 + w.w1 * x1 + w.w2 * x2 + w.w3 * x3)"
    p = f"(1.0 / (1.0 + exp(-{m})))"
    return (
        "WITH "
        + ",\n".join(parts)
        + f""",
cl_scored AS MATERIALIZED (
  SELECT CAST(floor({p} * 1000 + 0.5) AS BIGINT) AS p_e3,
         CAST(y AS BIGINT) AS label
  FROM fx, w{iters} w
), thr AS (
  SELECT
    sum(CASE WHEN label = 1 THEN p_e3 ELSE 0 END)
      // sum(CASE WHEN label = 1 THEN 1 ELSE 0 END) AS t1,
    sum(CASE WHEN label = 0 THEN 1000 - p_e3 ELSE 0 END)
      // sum(CASE WHEN label = 0 THEN 1 ELSE 0 END) AS t0
  FROM cl_scored
), preds AS (
  SELECT s.label,
    CASE
      WHEN s.p_e3 >= t.t1 AND 1000 - s.p_e3 >= t.t0 THEN
        CASE WHEN s.p_e3 >= 500 THEN 1 ELSE 0 END
      WHEN s.p_e3 >= t.t1 THEN 1
      WHEN 1000 - s.p_e3 >= t.t0 THEN 0
    END AS pred,
    t.t1, t.t0
  FROM cl_scored s, thr t
)
SELECT label, CAST(pred AS BIGINT) AS pred,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(max(t1) AS BIGINT) AS t1_e3,
       CAST(max(t0) AS BIGINT) AS t0_e3
FROM preds WHERE pred IS NOT NULL
GROUP BY 1, 2
"""
    )


def q_source_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source lexical diversity — Simpson concentration, its
    inverse (the 'effective vocabulary' ecologists call Hill number
    q=2) and Shannon entropy over the DSIR 64-bucket hashed-unigram
    space: the one-table diversity audit a mixture designer reads
    next to `source_kl` (KL says how far a source sits FROM the
    corpus; this says how internally repetitive the source itself is
    — boilerplate farms score near 1 effective bucket).  Completes
    the diversity family: `char_entropy` (character level, per doc),
    `source_kl` (divergence), this (concentration per source).

    Exact cross-engine integers, NO floats in Simpson: share_e6 =
    (c·1e6) DIV n_s, simpson_e12 = Σ share_e6² (≤ 64·1e12 — BIGINT-
    safe at ANY corpus size because shares are normalized before
    squaring), eff_e6 = 1e18 DIV simpson_e12; entropy is the
    `source_kl`/ccnet e3-floored-ln discipline: ent_ne3 =
    −Σ_{{c>0}} c·⌊ln(c/n_s)·1e3⌋ (safe to ~300T tokens/source),
    ent_e3 = ent_ne3 DIV n_s.  Zero buckets contribute 0 to both
    metrics, so no dense grid and no smoothing anywhere — a
    deliberately DIFFERENT spec from source_kl's Laplace form.

    Scale shape: ONE corpus-scale hash agg to (source × ≤64) rows;
    the shares/entropy folds are metadata-scale.  The bucket hash is
    the shared `_token_bucket` (changing it moves the dsir_weights,
    source_kl, AND source_diversity oracles)."""
    hexmap = _hex_digit_map()
    cnts = (
        _docs(spark, sf_dir)
        .where(F.trim("text") != "")
        .select("source", F.explode(_lm_tokens()).alias("tok"))
        .select(
            "source", _token_bucket(F.col("tok"), hexmap).alias("bucket")
        )
        .groupBy("source", "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    ns = cnts.groupBy("source").agg(F.sum("c").cast("long").alias("n_s"))
    per = cnts.join(ns, "source").select(
        "source",
        "n_s",
        F.expr("(c * 1000000) DIV n_s").alias("share_e6"),
        (
            -F.col("c")
            * F.floor(
                F.log(F.col("c") / F.col("n_s").cast("double")) * 1000.0
            ).cast("long")
        ).alias("ent_term"),
        (F.col("c") > 0).cast("long").alias("nz"),
    )
    agg = per.groupBy("source").agg(
        F.max("n_s").cast("long").alias("n_tokens"),
        F.sum("nz").cast("long").alias("n_buckets"),
        F.sum(F.col("share_e6") * F.col("share_e6"))
        .cast("long")
        .alias("simpson_e12"),
        F.sum("ent_term").cast("long").alias("ent_ne3"),
    )
    return agg.select(
        "source",
        "n_tokens",
        "n_buckets",
        "simpson_e12",
        F.expr("1000000000000000000 DIV simpson_e12").alias("eff_e6"),
        "ent_ne3",
        F.expr("ent_ne3 DIV n_tokens").alias("ent_e3"),
    )


_SOURCE_DIVERSITY_SQL = """
WITH toks AS (
  SELECT source, regexp_split_to_array(trim(lower(text)), '[ \\t\\n\\x0B\\f\\r]+') AS t
  FROM documents WHERE trim(text) <> ''
), tok AS (
  SELECT source,
         ((strpos('0123456789abcdef', substr(md5(tk), 1, 1)) - 1) * 16
          + (strpos('0123456789abcdef', substr(md5(tk), 2, 1)) - 1)) % 64 AS bucket
  FROM (SELECT source, unnest(t) AS tk FROM toks)
), counts AS (
  SELECT source, bucket, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY 1, 2
), ns AS (
  SELECT source, CAST(sum(c) AS BIGINT) AS n_s FROM counts GROUP BY 1
), per AS (
  SELECT c.source, n.n_s,
         (c.c * 1000000) // n.n_s AS share_e6,
         -c.c * CAST(floor(ln(c.c / CAST(n.n_s AS DOUBLE)) * 1000.0)
                     AS BIGINT) AS ent_term,
         CASE WHEN c.c > 0 THEN 1 ELSE 0 END AS nz
  FROM counts c JOIN ns n ON c.source = n.source
), agg AS (
  SELECT source, CAST(max(n_s) AS BIGINT) AS n_tokens,
         CAST(sum(nz) AS BIGINT) AS n_buckets,
         CAST(sum(share_e6 * share_e6) AS BIGINT) AS simpson_e12,
         CAST(sum(ent_term) AS BIGINT) AS ent_ne3
  FROM per GROUP BY 1
)
SELECT source, n_tokens, n_buckets, simpson_e12,
       CAST(1000000000000000000 // simpson_e12 AS BIGINT) AS eff_e6,
       ent_ne3,
       CAST(ent_ne3 // n_tokens AS BIGINT) AS ent_e3
FROM agg
"""


def q_vocab_richness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source vocabulary richness — Yule's K characteristic (Yule
    1944, "The Statistical Study of Literary Vocabulary"), Herdan's C
    (log type-token ratio), and the hapax/dis-legomena counts from
    the frequency spectrum: the classical stylometric complement to
    `source_diversity` (that one measures concentration over 64
    HASHED buckets — scale-bounded but blind to true vocabulary size;
    this one works over the real type space, so a template farm that
    spreads boilerplate across many buckets still shows a tiny V and
    a huge K).  Yule's K is length-invariant by design — the one
    richness number comparable across sources of different sizes.

    Semantics over the shared `_lm_tokens()` stream (another
    consumer — tokenizer changes move bigram_lm_score / good_turing /
    collocations_g2 / THIS): per source N = Σc, V = #types,
    V1/V2 = types with c==1/2, S2 = Σc²;
    K·1e6 = ((S2 − N)·1e10) DIV N² and hapax_e6 = (V1·1e6) DIV V.

    Cross-engine: S2 and the K numerator/denominator accumulate as
    DECIMAL(38,0) ↔ HUGEINT (the degree_assortativity rule — BIGINT
    Σc² overflows at ~3e9-token hot types; ×1e10 stays < 1e38); all
    operands non-negative so DIV/`//` agree; herdan_e5 =
    ⌊ln(V)/ln(N)·1e5⌋ is the e-floored-ln improbable-to-flip class
    (guarded N>1, V>1 — else 0).

    Scale shape: ONE corpus-scale (source × token) hash agg (partial
    map-side combine does the heavy lifting), then a per-source agg
    to |sources| rows — no joins, no windows, no driver data."""
    cnts = (
        _docs(spark, sf_dir)
        .where(F.trim("text") != "")
        .select("source", F.explode(_lm_tokens()).alias("tok"))
        .groupBy("source", "tok")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    agg = cnts.groupBy("source").agg(
        F.sum("c").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_types"),
        F.sum((F.col("c") == 1).cast("long")).cast("long").alias("hapax"),
        F.sum((F.col("c") == 2).cast("long")).cast("long").alias("dis"),
        F.sum((F.col("c") * F.col("c")).cast("decimal(38,0)")).alias("s2d"),
    )
    return agg.select(
        "source",
        "n_tokens",
        "n_types",
        "hapax",
        "dis",
        F.expr(
            "CAST(((s2d - n_tokens) * 10000000000)"
            " DIV (CAST(n_tokens AS DECIMAL(38,0)) * n_tokens) AS BIGINT)"
        ).alias("yule_k_e6"),
        F.expr("(hapax * 1000000) DIV n_types").alias("hapax_e6"),
        F.expr(
            "CAST(CASE WHEN n_types > 1 AND n_tokens > 1 THEN"
            " floor(ln(CAST(n_types AS DOUBLE))"
            " / ln(CAST(n_tokens AS DOUBLE)) * 100000.0)"
            " ELSE 0 END AS BIGINT)"
        ).alias("herdan_e5"),
    )


_VOCAB_RICHNESS_SQL = """
WITH toks AS (
  SELECT source,
         regexp_split_to_array(trim(lower(text)),
                               '[ \\t\\n\\x0B\\f\\r]+') AS t
  FROM documents WHERE trim(text) <> ''
), counts AS (
  SELECT source, tk, CAST(count(*) AS BIGINT) AS c
  FROM (SELECT source, unnest(t) AS tk FROM toks) GROUP BY 1, 2
), agg AS (
  SELECT source,
         CAST(sum(c) AS BIGINT) AS n_tokens,
         CAST(count(*) AS BIGINT) AS n_types,
         CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax,
         CAST(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS dis,
         sum(CAST(c AS HUGEINT) * c) AS s2d
  FROM counts GROUP BY 1
)
SELECT source, n_tokens, n_types, hapax, dis,
       CAST(((s2d - n_tokens) * 10000000000)
            // (CAST(n_tokens AS HUGEINT) * n_tokens) AS BIGINT)
         AS yule_k_e6,
       CAST((hapax * 1000000) // n_types AS BIGINT) AS hapax_e6,
       CAST(CASE WHEN n_types > 1 AND n_tokens > 1 THEN
         floor(ln(CAST(n_types AS DOUBLE))
               / ln(CAST(n_tokens AS DOUBLE)) * 100000.0)
         ELSE 0 END AS BIGINT) AS herdan_e5
FROM agg
"""


# Sliced-W1 spec — MIRRORED in `_sliced_w1_sql`; change together.
# Projections are the random_projection spec verbatim (e4 floors +
# `_rp_signs` ±1 folds — sign/salt changes move THREE oracles now);
# buckets = proj DIV SW1_BUCKET (signed truncating DIV, ≈129 buckets
# at ±64e4 range); per (pair, direction) the W1 is the source_w1_drift
# rule — e9 CDFs over the densified direction-bucket grid, Σ|Δcdf|·gap
# with the lead-NULL last bucket excluded — then mean over directions.
SW1_BUCKET = 10000


def q_source_sliced_w1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliced Wasserstein-1 distance between source EMBEDDING clouds
    (Rabin et al. 2011; Bonneel 2015 — the standard cheap OT
    surrogate): project every embedding onto the RP_DIM fixed ±1
    directions, take the 1-D W1 between each source pair per
    direction, average.  The embedding-space complement of
    `source_w1_drift` (quality marginals) and `source_centroid_sim`
    (first moments only): two sources can share a centroid yet have
    disjoint clouds — sliced W1 sees the shape, and it is exactly the
    quantity a mixture designer tracks as 'distribution distance'
    between data sources before reweighting.

    Cross-engine exact: projections are the random_projection e4
    integer coords folded with the `_rp_signs` literals; bucket =
    proj DIV SW1_BUCKET (signed DIV truncates toward zero on both
    engines); per (pair, direction) W1 = Σ|Δcdf|·gap on e9 integer
    CDFs over observed buckets (the source_w1_drift form, last
    bucket excluded by the lead-NULL rule); the direction mean is
    Σ w1_k DIV RP_DIM.  The doc_id == vec_id correspondence supplies
    `source` (the rrf/source_centroid_sim convention).

    Scale shape: pure map → ONE corpus-scale (source × dir × ≤129
    bucket) hash agg; the grid/CDF windows and the all-pairs join run
    on that bounded table — metadata-scale at any corpus size."""
    from pyspark.sql.window import Window

    signs = _rp_signs()
    docs = _docs(spark, sf_dir).select("doc_id", "source")
    emb = _emb(spark, sf_dir).select(
        "vec_id",
        F.transform(
            "embedding",
            lambda x: F.floor(
                x.cast("double") * F.lit(10000.0) + F.lit(0.5)
            ).cast("long"),
        ).alias("xe"),
    )
    proj = docs.join(emb, docs.doc_id == emb.vec_id).select(
        "source",
        *[
            sum(
                (
                    F.element_at("xe", i + 1)
                    if s == 1
                    else -F.element_at("xe", i + 1)
                )
                for i, s in enumerate(signs[k])
            ).alias(f"y{k}")
            for k in range(RP_DIM)
        ],
    )
    longf = proj.select(
        "source",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).cast("long").alias("dir"),
                        F.expr(f"y{k} DIV {SW1_BUCKET}").alias("bk"),
                    )
                    for k in range(RP_DIM)
                ]
            )
        ).alias("e"),
    ).select("source", F.col("e.dir").alias("dir"), F.col("e.bk").alias("bk"))
    hist = longf.groupBy("source", "dir", "bk").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    tot = hist.groupBy("source").agg(
        F.expr(f"CAST(sum(c) DIV {RP_DIM} AS BIGINT)").alias("n")
    )
    bks = hist.select("dir", "bk").distinct()
    nxt = bks.withColumn(
        "bk_next",
        F.lead("bk").over(Window.partitionBy("dir").orderBy("bk")),
    )
    grid = tot.crossJoin(F.broadcast(bks))
    cum = (
        grid.join(hist, ["source", "dir", "bk"], "left")
        .select(
            "source",
            "n",
            "dir",
            "bk",
            F.coalesce("c", F.lit(0).cast("long")).alias("c0"),
        )
        .withColumn(
            "cum",
            F.sum("c0")
            .over(Window.partitionBy("source", "dir").orderBy("bk"))
            .cast("long"),
        )
    )
    cdf = cum.select(
        "source",
        "n",
        "dir",
        "bk",
        F.expr("(cum * 1000000000) DIV n").alias("cdf"),
    )
    a = cdf.select(
        F.col("source").alias("source_a"),
        F.col("n").alias("n_a"),
        "dir",
        "bk",
        F.col("cdf").alias("cdf_a"),
    )
    b = cdf.select(
        F.col("source").alias("source_b"),
        F.col("n").alias("n_b"),
        "dir",
        "bk",
        F.col("cdf").alias("cdf_b"),
    )
    pairs = (
        a.join(b, ["dir", "bk"])
        .where(F.col("source_a") < F.col("source_b"))
        .join(nxt, ["dir", "bk"])
        .where(F.col("bk_next").isNotNull())
        .groupBy("source_a", "source_b")
        .agg(
            F.max("n_a").cast("long").alias("n_a"),
            F.max("n_b").cast("long").alias("n_b"),
            F.sum(
                F.abs(F.col("cdf_a") - F.col("cdf_b"))
                * (F.col("bk_next") - F.col("bk"))
            )
            .cast("long")
            .alias("sum_w1"),
        )
    )
    return pairs.select(
        "source_a",
        "source_b",
        "n_a",
        "n_b",
        F.expr(f"sum_w1 DIV {RP_DIM}").alias("sw1_e9b"),
    )


def _sliced_w1_sql(bucket: int | None = None) -> str:
    """source_sliced_w1 oracle: the spliced ±1 sign folds and e4
    floors, signed-DIV buckets, the source_w1_drift CDF/gap chain per
    direction, Σ DIV RP_DIM direction mean."""
    bucket = SW1_BUCKET if bucket is None else bucket
    signs = _rp_signs()
    ys = ",\n         ".join(
        "("
        + " ".join(
            ("+ " if s == 1 else "- ") + f"xe[{i + 1}]"
            for i, s in enumerate(signs[k])
        ).lstrip("+ ")
        + f") AS y{k}"
        for k in range(RP_DIM)
    )
    unions = "\n  UNION ALL\n".join(
        f"  SELECT source, CAST({k} AS BIGINT) AS dir,"
        f" y{k} // {bucket} AS bk FROM proj"
        for k in range(RP_DIM)
    )
    return f"""
WITH xe AS (
  SELECT vec_id,
         list_transform(embedding,
           x -> CAST(floor(CAST(x AS DOUBLE) * 10000 + 0.5) AS BIGINT)) AS xe
  FROM embeddings
), proj AS (
  SELECT d.source,
         {ys}
  FROM xe JOIN documents d ON d.doc_id = xe.vec_id
), longf AS (
{unions}
), hist AS (
  SELECT source, dir, bk, CAST(count(*) AS BIGINT) AS c
  FROM longf GROUP BY 1, 2, 3
), tot AS (
  SELECT source, CAST(sum(c) // {RP_DIM} AS BIGINT) AS n
  FROM hist GROUP BY 1
), bks AS (SELECT DISTINCT dir, bk FROM hist),
nxt AS (
  SELECT dir, bk, lead(bk) OVER (PARTITION BY dir ORDER BY bk) AS bk_next
  FROM bks
), grid AS (SELECT t.source, t.n, b.dir, b.bk FROM tot t, bks b),
cum AS (
  SELECT g.source, g.n, g.dir, g.bk,
         CAST(sum(coalesce(h.c, 0)) OVER (
           PARTITION BY g.source, g.dir ORDER BY g.bk) AS BIGINT) AS cum
  FROM grid g LEFT JOIN hist h
    ON g.source = h.source AND g.dir = h.dir AND g.bk = h.bk
), cdf AS (
  SELECT source, n, dir, bk,
         CAST((cum * 1000000000) // n AS BIGINT) AS cdf
  FROM cum
)
SELECT a.source AS source_a, b.source AS source_b,
       CAST(max(a.n) AS BIGINT) AS n_a,
       CAST(max(b.n) AS BIGINT) AS n_b,
       CAST(sum(abs(a.cdf - b.cdf) * (x.bk_next - x.bk)) // {RP_DIM}
            AS BIGINT) AS sw1_e9b
FROM cdf a
JOIN cdf b ON a.dir = b.dir AND a.bk = b.bk AND a.source < b.source
JOIN nxt x ON a.dir = x.dir AND a.bk = x.bk
WHERE x.bk_next IS NOT NULL
GROUP BY 1, 2
"""


# Anisotropy spec — MIRRORED in `_anisotropy_sql`; change together.
# Per-row unit-normalize (norm fold expands textually in index order
# — the source_centroid_sim rule) then e4-floor to ints; the pairwise
# mean cosine is EXACT via Σ_{i≠j} u_i·u_j = ‖Σu‖² − Σ‖u‖² — per-dim
# sums S_j and the self term D in DECIMAL(38,0) ↔ HUGEINT, mean =
# signed truncating DIV by n(n−1)·100 (e8 products → e6 output).
ANISO_DIM = 64


def q_embedding_anisotropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space anisotropy audit (Ethayarajh 2019, "How
    Contextual are Contextualized Word Representations?"): the
    expected cosine between two random vectors — ~0 for an isotropic
    space, → 1 when all vectors crowd a narrow cone (the degeneration
    that silently breaks cosine-threshold dedup like `semantic_dedup`
    and calibration like `minhash_calibration`; the number a pipeline
    checks BEFORE trusting any cosine cutoff).

    The trick that makes it exact at any scale: over unit vectors,
    Σ_{i≠j} u_i·u_j = ‖Σ_i u_i‖² − Σ_i ‖u_i‖² — so the all-pairs mean
    needs only the per-dim coordinate sums S_j and the self-dot total
    D, never a pair join.  Coordinates are per-row normalized (norm
    fold in index order, IEEE ÷/sqrt bit-exact) then e4-floored to
    BIGINTs; S_j and D accumulate DECIMAL(38,0) ↔ HUGEINT; P = Σ_j
    S_j² exact; mean_cos_e6 = (P − D) DIV (n(n−1)·100) — signed
    truncating DIV (both engines truncate toward zero).  mean_self_e6
    = D DIV (n·100) ≈ 1e6 is the built-in normalization check.

    Scale shape: pure per-row map → ONE scalar agg (65 partial-agg
    columns) → a metadata-scale projection; output is one row."""
    dim = ANISO_DIM
    x = [
        F.element_at("embedding", j + 1).cast("double")
        for j in range(dim)
    ]
    n2 = x[0] * x[0]
    for j in range(1, dim):
        n2 = n2 + x[j] * x[j]
    nrm = F.sqrt(n2)
    q = [
        F.floor(x[j] / nrm * F.lit(10000.0) + F.lit(0.5)).cast("long")
        for j in range(dim)
    ]
    emb = (
        _emb(spark, sf_dir)
        .where(nrm > 0)
        .select(*[q[j].alias(f"q{j}") for j in range(dim)])
    )
    dec = "decimal(38,0)"
    self2 = F.col("q0") * F.col("q0")
    for j in range(1, dim):
        self2 = self2 + F.col(f"q{j}") * F.col(f"q{j}")
    agg = emb.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        *[
            F.sum(F.col(f"q{j}").cast(dec)).alias(f"s{j}")
            for j in range(dim)
        ],
        F.sum(self2.cast(dec)).alias("d"),
    )
    p = " + ".join(f"s{j} * s{j}" for j in range(dim))
    return agg.selectExpr(
        "CAST(n AS BIGINT) AS n_vecs",
        f"CAST(CASE WHEN n > 1 THEN (({p}) - d)"
        " DIV (CAST(n AS DECIMAL(38,0)) * (n - 1) * 100)"
        " ELSE 0 END AS BIGINT) AS mean_cos_e6",
        "CAST(d DIV (CAST(n AS DECIMAL(38,0)) * 100) AS BIGINT)"
        " AS mean_self_e6",
    )


def _anisotropy_sql(dim: int | None = None) -> str:
    """embedding_anisotropy oracle: identical index-order norm fold,
    e4 floors, HUGEINT sums and the same ‖Σu‖² − Σ‖u‖² mean."""
    dim = ANISO_DIM if dim is None else dim
    n2 = " + ".join(
        f"CAST(embedding[{j + 1}] AS DOUBLE)"
        f" * CAST(embedding[{j + 1}] AS DOUBLE)"
        for j in range(dim)
    )
    qs = ", ".join(
        f"CAST(floor(CAST(embedding[{j + 1}] AS DOUBLE) / nrm * 10000"
        f" + 0.5) AS BIGINT) AS q{j}"
        for j in range(dim)
    )
    self2 = " + ".join(f"q{j} * q{j}" for j in range(dim))
    sums = ", ".join(f"sum(q{j}) AS s{j}" for j in range(dim))
    p = " + ".join(f"s{j} * s{j}" for j in range(dim))
    return f"""
WITH nr AS (
  SELECT embedding, sqrt({n2}) AS nrm FROM embeddings
), qv AS (
  SELECT {qs} FROM nr WHERE nrm > 0
), agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n, {sums},
         sum({self2}) AS d
  FROM qv
)
SELECT CAST(n AS BIGINT) AS n_vecs,
       CAST(CASE WHEN n > 1 THEN (({p}) - d)
            // (CAST(n AS HUGEINT) * (n - 1) * 100)
            ELSE 0 END AS BIGINT) AS mean_cos_e6,
       CAST(d // (CAST(n AS HUGEINT) * 100) AS BIGINT) AS mean_self_e6
FROM agg
"""


# Branching-entropy spec — MIRRORED in `_branching_sql`; change
# together.  Pairs come from the shared `_bigrams()` strings keyed by
# split_part(bg,' ',1)/(2) (the bigram_lm join-key convention), so
# tokenizer changes move this oracle with the bigram family; entropy
# is the source_diversity e3-floored-ln fold −Σ c·⌊ln(c/C)·1e3⌋ DIV C;
# ranking (c_left DESC, tok), top BRANCH_TOPK.
BRANCH_TOPK = 50


def q_branching_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Branching entropy + accessor variety per token (Harris 1955's
    morpheme-boundary signal; Feng et al. 2004 accessor variety; Jin
    & Tanaka-Ishii 2006 branching entropy) — the unsupervised
    segmentation/termhood statistic: a token whose RIGHT context is
    low-entropy sits inside a multiword unit ("york" after "new"),
    one with high right-branching entropy ends a unit.  Per
    top-``BRANCH_TOPK`` token (by left-endpoint count): both
    accessor varieties (distinct left/right neighbors) and both
    branching entropies — the table a collocation extractor reads
    next to `collocations_g2` (G² scores the PAIR; this scores the
    BOUNDARY).

    Cross-engine exact: neighbor counts come from the distinct-pair
    table (marginals = endpoint sums — the cooc convention); entropy
    is the source_diversity discipline ent_ne3 = −Σ_b c_ab·
    ⌊ln(c_ab/C_a)·1e3⌋, ent_e3 = ent_ne3 DIV C_a (all BIGINT, the
    ln floor is the improbable-to-flip class); missing-side stats
    coalesce 0 (a top token may never appear as a right endpoint).

    Scale shape: ONE corpus-scale pair hash agg; the marginal
    windows partition by token over DISTINCT-pair rows (bounded by
    the observed right/left vocabulary of each token); top-k is
    TakeOrderedAndProject; the side join is vocab-scale."""
    from pyspark.sql.window import Window

    live = _docs(spark, sf_dir).where(F.trim("text") != "")
    cab = (
        live.select(F.explode(_bigrams()).alias("bg"))
        .select(
            F.expr("split_part(bg, ' ', 1)").alias("a"),
            F.expr("split_part(bg, ' ', 2)").alias("b"),
        )
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )

    def stats(key: str, cn: str, avn: str, entn: str):
        w = Window.partitionBy(key)
        per = cab.withColumn("ct", F.sum("c").over(w).cast("long"))
        term = (
            -F.col("c")
            * F.floor(
                F.log(F.col("c") / F.col("ct").cast("double")) * 1000.0
            ).cast("long")
        )
        return (
            per.select(key, "ct", term.alias("term"))
            .groupBy(key)
            .agg(
                F.max("ct").cast("long").alias(cn),
                F.count(F.lit(1)).cast("long").alias(avn),
                F.sum("term").cast("long").alias("ne3"),
            )
            .select(
                F.col(key).alias("tok"),
                cn,
                avn,
                F.expr(f"ne3 DIV {cn}").alias(entn),
            )
        )

    ls = stats("a", "c_left", "av_r", "ent_r_e3")
    rs = stats("b", "c_right", "av_l", "ent_l_e3")
    top = ls.orderBy(F.desc("c_left"), "tok").limit(BRANCH_TOPK)
    return top.join(rs, "tok", "left").select(
        "tok",
        "c_left",
        "av_r",
        "ent_r_e3",
        F.coalesce("c_right", F.lit(0).cast("long")).alias("c_right"),
        F.coalesce("av_l", F.lit(0).cast("long")).alias("av_l"),
        F.coalesce("ent_l_e3", F.lit(0).cast("long")).alias("ent_l_e3"),
    )


def _branching_sql(topk: int | None = None) -> str:
    """branching_entropy oracle: the shared bigram chain, the same
    distinct-pair marginals/windows, the source_diversity e3-ln
    fold, (c_left DESC, tok) top-k, left-join coalesce 0."""
    topk = BRANCH_TOPK if topk is None else topk
    return f"""
WITH toks AS (
  SELECT doc_id,
         regexp_split_to_array(trim(lower(text)),
                               '[ \\t\\n\\x0B\\f\\r]+') AS t
  FROM documents WHERE trim(text) <> ''
), pairs AS (
  SELECT doc_id, list_transform(generate_series(1, len(t) - 1),
                                i -> t[i] || ' ' || t[i+1]) AS g2
  FROM toks
), bgx AS (
  SELECT unnest(g2) AS bg FROM pairs
), cab AS (
  SELECT split_part(bg, ' ', 1) AS a, split_part(bg, ' ', 2) AS b,
         CAST(count(*) AS BIGINT) AS c
  FROM bgx GROUP BY 1, 2
), lper AS (
  SELECT a, c, CAST(sum(c) OVER (PARTITION BY a) AS BIGINT) AS ct
  FROM cab
), ls AS (
  SELECT a AS tok, CAST(max(ct) AS BIGINT) AS c_left,
         CAST(count(*) AS BIGINT) AS av_r,
         CAST(sum(-c * CAST(floor(ln(c / CAST(ct AS DOUBLE)) * 1000.0)
                            AS BIGINT)) AS BIGINT) AS ne3
  FROM lper GROUP BY 1
), rper AS (
  SELECT b, c, CAST(sum(c) OVER (PARTITION BY b) AS BIGINT) AS ct
  FROM cab
), rs AS (
  SELECT b AS tok, CAST(max(ct) AS BIGINT) AS c_right,
         CAST(count(*) AS BIGINT) AS av_l,
         CAST(sum(-c * CAST(floor(ln(c / CAST(ct AS DOUBLE)) * 1000.0)
                            AS BIGINT)) AS BIGINT) AS ne3
  FROM rper GROUP BY 1
), top AS (
  SELECT tok, c_left, av_r, CAST(ne3 // c_left AS BIGINT) AS ent_r_e3
  FROM ls ORDER BY c_left DESC, tok LIMIT {topk}
)
SELECT t.tok, t.c_left, t.av_r, t.ent_r_e3,
       CAST(coalesce(r.c_right, 0) AS BIGINT) AS c_right,
       CAST(coalesce(r.av_l, 0) AS BIGINT) AS av_l,
       CAST(coalesce(r.ne3 // r.c_right, 0) AS BIGINT) AS ent_l_e3
FROM top t LEFT JOIN rs r ON t.tok = r.tok
"""


def _hll_est(nu: str, sn: str) -> str:
    """The HLL estimate expression (raw/linear-counting CASE) over
    named register-summary columns — ONE text helper spliced into
    BOTH engines (the _g2_term rule), parameterized so hll_intersect
    can apply it to the per-source AND merged-union summaries."""
    two47 = 1 << (HLL_REM_BITS + 1)
    # CAST the literals: Spark parses bare decimals as DECIMAL and
    # constant-folds the prefix in decimal arithmetic (8th-digit
    # divergence vs DuckDB's doubles — measured as a floor flip).
    raw = (
        f"((CAST(0.7213 AS DOUBLE) / (CAST(1.0 AS DOUBLE)"
        f" + CAST(1.079 AS DOUBLE) / {HLL_M}.0)) * {HLL_M}.0 * {HLL_M}.0"
        f" * {two47}.0 / CAST({sn} AS DOUBLE))"
    )
    lin = f"({HLL_M}.0 * ln({HLL_M}.0 / CAST({HLL_M} - {nu} AS DOUBLE)))"
    return (
        f"CAST(floor(CASE WHEN {HLL_M} - CAST({nu} AS INT) > 0"
        f" AND {raw} <= 2.5 * {HLL_M}.0 THEN {lin}"
        f" ELSE {raw} END * 1000) AS BIGINT)"
    )


def q_hll_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise source OVERLAP estimates from merged HLL sketches —
    the sketch-algebra step that makes `hll_distinct` useful as
    infrastructure (Flajolet's key property: HLL registers MERGE by
    max, so |A∪B| comes from two already-built per-source sketches
    without touching the data again, and |A∩B| ≈ Ê(A)+Ê(B)−Ê(A∪B)
    by inclusion-exclusion): per source pair, the three estimates,
    the signed intersection estimate, and the EXACT shared-bigram
    count as the audit column — the comparison a capacity planner
    reads before trusting sketch unions corpus-wide.

    Cross-engine: registers use the M_j = 0 empty convention so the
    harmonic sum is uniformly Σ 2^(47−M_j) over the densified
    sources×64 grid (empty registers contribute 2^47 — identical to
    hll_distinct's (m−used)·2^47 term); merge = greatest per bucket;
    the estimate is `_hll_est`, ONE expression text on exact BIGINT
    summaries; inclusion-exclusion subtracts the e3 floors (exact
    BIGINT, signed — small overlaps can go negative, that's the
    sketch's real behavior).

    Scale shape: ONE corpus-scale (source × 64) register agg; the
    pair merge runs on the bounded grid (sources² × 64); the exact
    audit is one distinct + one equi-self-join on type — the only
    corpus-sized part, and exactly what the sketch replaces."""
    docs = (
        _docs(spark, sf_dir)
        .select("source", "text")
        .where(F.trim("text") != "")
    )
    tg = docs.select("source", F.explode(_bigrams()).alias("g"))
    keyed = tg.select(
        "source",
        F.expr(
            "cast(conv(substring(md5(g), 1, 13), 16, 10) AS bigint)"
        ).alias("x"),
    ).select(
        "source",
        (F.col("x") % HLL_M).alias("b"),
        F.expr(_hll_rho_case(f"(x DIV {HLL_M})")).cast("long").alias("rho"),
    )
    regs0 = keyed.groupBy("source", "b").agg(
        F.max("rho").cast("long").alias("m_j")
    )
    srcs = regs0.select("source").distinct()
    grid = srcs.crossJoin(
        F.broadcast(
            spark.range(HLL_M).select(F.col("id").cast("long").alias("b"))
        )
    )
    regs = grid.join(regs0, ["source", "b"], "left").select(
        "source",
        "b",
        F.coalesce("m_j", F.lit(0).cast("long")).alias("m_j"),
    )

    def summarize(df: DataFrame, keys: list[str]) -> DataFrame:
        return df.groupBy(*keys).agg(
            F.sum((F.col("m_j") > 0).cast("long")).cast("long").alias(
                "n_used"
            ),
            F.sum(
                F.expr(
                    f"shiftleft(CAST(1 AS BIGINT),"
                    f" CAST({HLL_REM_BITS + 1} - m_j AS INT))"
                )
            )
            .cast("long")
            .alias("s_num"),
        )

    per = summarize(regs, ["source"]).selectExpr(
        "source", f"{_hll_est('n_used', 's_num')} AS est_e3"
    )
    a = regs.select(
        F.col("source").alias("source_a"), "b", F.col("m_j").alias("ma")
    )
    b = regs.select(
        F.col("source").alias("source_b"), "b", F.col("m_j").alias("mb")
    )
    merged = (
        a.join(b, "b")
        .where(F.col("source_a") < F.col("source_b"))
        .select(
            "source_a",
            "source_b",
            "b",
            F.greatest("ma", "mb").alias("m_j"),
        )
    )
    un = summarize(merged, ["source_a", "source_b"]).selectExpr(
        "source_a",
        "source_b",
        f"{_hll_est('n_used', 's_num')} AS est_union_e3",
    )
    exact = (
        tg.distinct()
        .groupBy("g")
        .agg(F.collect_set("source").alias("ss"))
        .select(F.explode("ss").alias("source_a"), "ss")
        .select(
            "source_a", F.explode("ss").alias("source_b")
        )
        .where(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_exact_inter"))
    )
    ea = per.select(
        F.col("source").alias("source_a"), F.col("est_e3").alias("est_a_e3")
    )
    eb = per.select(
        F.col("source").alias("source_b"), F.col("est_e3").alias("est_b_e3")
    )
    return (
        un.join(F.broadcast(ea), "source_a")
        .join(F.broadcast(eb), "source_b")
        .join(exact, ["source_a", "source_b"], "left")
        .select(
            "source_a",
            "source_b",
            "est_a_e3",
            "est_b_e3",
            "est_union_e3",
            (
                F.col("est_a_e3") + F.col("est_b_e3") - F.col("est_union_e3")
            ).alias("est_inter_e3"),
            F.coalesce("n_exact_inter", F.lit(0).cast("long")).alias(
                "n_exact_inter"
            ),
        )
    )


def _hll_intersect_sql() -> str:
    """hll_intersect oracle: identical key/rho/register chain with
    the densified M=0 convention, greatest-merge, the SAME spliced
    `_hll_est` text, inclusion-exclusion on the e3 floors, and the
    exact shared-type audit join."""
    return f"""
WITH tg AS (
  SELECT d.source, unnest(list_transform(generate_series(1, len(t) - 1),
                          i -> t[i] || ' ' || t[i+1])) AS g
  FROM (SELECT source,
               regexp_split_to_array(trim(lower(text)),
                                     '[ \\t\\n\\x0B\\f\\r]+') AS t
        FROM documents WHERE trim(text) <> '') d
), kx AS (
  SELECT source, ('0x' || substr(md5(g), 1, 13))::BIGINT AS x FROM tg
), keyed AS (
  SELECT source, x % {HLL_M} AS b,
         {_hll_rho_case(f"(x // {HLL_M})")} AS rho
  FROM kx
), regs0 AS (
  SELECT source, b, CAST(max(rho) AS BIGINT) AS m_j
  FROM keyed GROUP BY 1, 2
), srcs AS (SELECT DISTINCT source FROM regs0),
grid AS (
  SELECT s.source, CAST(gb.i AS BIGINT) AS b
  FROM srcs s, (SELECT unnest(generate_series(0, {HLL_M - 1})) AS i) gb
), regs AS (
  SELECT g.source, g.b, CAST(coalesce(r.m_j, 0) AS BIGINT) AS m_j
  FROM grid g LEFT JOIN regs0 r ON g.source = r.source AND g.b = r.b
), per AS (
  SELECT source,
         CAST(sum(CASE WHEN m_j > 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_used,
         CAST(sum((CAST(1 AS BIGINT) << CAST({HLL_REM_BITS + 1} - m_j
                                             AS INTEGER))) AS BIGINT)
           AS s_num
  FROM regs GROUP BY 1
), pere AS (
  SELECT source, {_hll_est('n_used', 's_num')} AS est_e3 FROM per
), merged AS (
  SELECT a.source AS source_a, b.source AS source_b, a.b,
         greatest(a.m_j, b.m_j) AS m_j
  FROM regs a JOIN regs b ON a.b = b.b AND a.source < b.source
), unio AS (
  SELECT source_a, source_b,
         CAST(sum(CASE WHEN m_j > 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_used,
         CAST(sum((CAST(1 AS BIGINT) << CAST({HLL_REM_BITS + 1} - m_j
                                             AS INTEGER))) AS BIGINT)
           AS s_num
  FROM merged GROUP BY 1, 2
), une AS (
  SELECT source_a, source_b,
         {_hll_est('n_used', 's_num')} AS est_union_e3
  FROM unio
), dtypes AS (SELECT DISTINCT source, g FROM tg),
exact AS (
  SELECT a.source AS source_a, b.source AS source_b,
         CAST(count(*) AS BIGINT) AS n_exact_inter
  FROM dtypes a JOIN dtypes b
    ON a.g = b.g AND a.source < b.source
  GROUP BY 1, 2
)
SELECT u.source_a, u.source_b,
       ea.est_e3 AS est_a_e3, eb.est_e3 AS est_b_e3,
       u.est_union_e3,
       ea.est_e3 + eb.est_e3 - u.est_union_e3 AS est_inter_e3,
       CAST(coalesce(x.n_exact_inter, 0) AS BIGINT) AS n_exact_inter
FROM une u
JOIN pere ea ON u.source_a = ea.source
JOIN pere eb ON u.source_b = eb.source
LEFT JOIN exact x
  ON u.source_a = x.source_a AND u.source_b = x.source_b
"""


# Set-similarity-join spec — MIRRORED in `_set_simjoin_sql`; change
# together.  Jaccard threshold τ = PPJ_NUM/PPJ_DEN; token universe =
# per-doc DISTINCT `_lm_tokens()` ranked globally by (df ASC, tok)
# (rarest first — the selectivity that makes prefix filtering work);
# prefix length = n − ⌈τ·n⌉ + 1 with ⌈·⌉ = (NUM·n + DEN − 1) DIV DEN.
# Rides `_DUPS_CTE`/with_injected_dups — dup-injection changes move
# this oracle too.
PPJ_NUM = 19
PPJ_DEN = 20


def q_set_simjoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact set-similarity self-join with prefix filtering (the
    PPJoin family — Chaudhuri et al. 2006 SSJoin / Xiao et al. 2008)
    — the EXACT counterpart of `dedup_minhash_lsh`: all document
    pairs with token-set Jaccard ≥ τ, NO false negatives (the
    prefix-filter theorem: two sets with J ≥ τ must share a token in
    their first n − ⌈τ·n⌉ + 1 rarest tokens), no probabilistic
    bands.  LSH answers 'probably similar cheaply'; this answers
    'provably all pairs above τ' — the verification pass a dedup
    audit runs over LSH's output region, here run standalone over
    the injected-dup universe.

    Cross-engine exact: tokens order by the (df ASC, tok) pair
    DIRECTLY — the same deterministic total order a global dense
    rank would give, with NO global window anywhere (a corpus-scale
    vocabulary never funnels through one task); prefix lengths are
    the integer ceiling form; verification is pure set arithmetic
    (inter·DEN ≥ NUM·(na + nb − inter)) and jacc_e6 an integer DIV.

    Scale shape: df is one hash agg; per-doc ordering is a local
    array sort of (df, tok) structs; candidates explode only
    ~(1−τ)·|d|+1 RARE tokens per doc, so the equi-join on tok is
    sparse by construction — the whole point of PPJoin; verification
    touches candidate pairs only."""
    from rxtls_spark.operators.dedup import with_injected_dups

    docs = (
        with_injected_dups(
            _docs(spark, sf_dir).select("doc_id", "text", "lang")
        )
        .where(F.trim("text") != "")
        .select("doc_id", "text")
    )
    toks = docs.select(
        "doc_id",
        F.explode(F.array_distinct(_lm_tokens())).alias("tok"),
    )
    vocab = toks.groupBy("tok").agg(
        F.count(F.lit(1)).cast("long").alias("df")
    )
    arrs = (
        toks.join(vocab, "tok")
        .groupBy("doc_id")
        .agg(
            F.expr(
                "array_sort(collect_list(struct(df, tok))).tok"
            ).alias("rs")
        )
        .select(
            "doc_id",
            "rs",
            F.size("rs").cast("long").alias("n"),
            F.expr(
                f"size(rs) - (({PPJ_NUM} * size(rs) + {PPJ_DEN - 1})"
                f" DIV {PPJ_DEN}) + 1"
            ).alias("p"),
        )
        .localCheckpoint(eager=False)
    )
    pre = arrs.select(
        "doc_id",
        F.explode(F.slice("rs", 1, F.col("p").cast("int"))).alias("tok"),
    )
    cand = (
        pre.select(F.col("doc_id").alias("a"), "tok")
        .join(pre.select(F.col("doc_id").alias("b"), "tok"), "tok")
        .where(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )
    aa = arrs.select(
        F.col("doc_id").alias("a"),
        F.col("rs").alias("rs_a"),
        F.col("n").alias("n_a"),
    )
    bb = arrs.select(
        F.col("doc_id").alias("b"),
        F.col("rs").alias("rs_b"),
        F.col("n").alias("n_b"),
    )
    ver = (
        cand.join(aa, "a")
        .join(bb, "b")
        .select(
            "a",
            "b",
            "n_a",
            "n_b",
            F.size(F.array_intersect("rs_a", "rs_b"))
            .cast("long")
            .alias("inter"),
        )
        .where(
            F.col("inter") * PPJ_DEN
            >= PPJ_NUM * (F.col("n_a") + F.col("n_b") - F.col("inter"))
        )
    )
    return ver.select(
        F.col("a").alias("doc_a"),
        F.col("b").alias("doc_b"),
        "n_a",
        "n_b",
        "inter",
        F.expr("(inter * 1000000) DIV (n_a + n_b - inter)").alias(
            "jacc_e6"
        ),
    )


def _set_simjoin_sql(num: int | None = None, den: int | None = None) -> str:
    """set_simjoin oracle: the `_DUPS_CTE` universe, per-doc token
    lists in the identical (df ASC, tok) order (no global rank —
    mirrors the windowless Spark plan), integer-ceiling prefixes,
    tok equi-join candidates, list_intersect verification."""
    num = PPJ_NUM if num is None else num
    den = PPJ_DEN if den is None else den
    return _DUPS_CTE + f"""
, live AS (
  SELECT doc_id, text FROM docs WHERE trim(text) <> ''
), toksx AS (
  SELECT doc_id,
         unnest(list_distinct(regexp_split_to_array(trim(lower(text)),
                '[ \\t\\n\\x0B\\f\\r]+'))) AS tok
  FROM live
), vocab AS (
  SELECT tok, CAST(count(*) AS BIGINT) AS df FROM toksx GROUP BY 1
), arrs AS (
  SELECT t.doc_id, list(t.tok ORDER BY v.df, t.tok) AS rs,
         CAST(count(*) AS BIGINT) AS n,
         CAST(count(*) - (({num} * count(*) + {den - 1}) // {den}) + 1
              AS BIGINT) AS p
  FROM toksx t JOIN vocab v ON t.tok = v.tok
  GROUP BY 1
), pre AS (
  SELECT doc_id, unnest(rs[1:CAST(p AS INTEGER)]) AS tok FROM arrs
), cand AS (
  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
  FROM pre x JOIN pre y ON x.tok = y.tok AND x.doc_id < y.doc_id
), ver AS (
  SELECT c.a, c.b, aa.n AS n_a, bb.n AS n_b,
         CAST(len(list_intersect(aa.rs, bb.rs)) AS BIGINT) AS inter
  FROM cand c
  JOIN arrs aa ON c.a = aa.doc_id
  JOIN arrs bb ON c.b = bb.doc_id
)
SELECT a AS doc_a, b AS doc_b, n_a, n_b, inter,
       CAST((inter * 1000000) // (n_a + n_b - inter) AS BIGINT) AS jacc_e6
FROM ver
WHERE inter * {den} >= {num} * (n_a + n_b - inter)
"""


def q_lof_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local Outlier Factor over the embedding kNN graph (Breunig et
    al. 2000) — the density-RATIO outlier score that catches what
    global screens miss: a vector can sit at a normal distance from
    the corpus (quality_outliers-style z-scores pass it) yet be
    isolated RELATIVE to its own neighborhood's density — mislabeled
    scrapes, encoding glitches, and off-manifold embeddings show up
    exactly there.  LOF ≈ 1 → inlier; ≫ 1 → local outlier.

    Built ENTIRELY on the proven `knn_graph` edges (another
    `_kmeans_cents_ctes`/KNN_K consumer — kmeans/KNN changes flow
    in): d = 1e5 − cos_e5 (integer cosine distance), k-dist(p) =
    max d over p's kept neighbors, reach(p→o) = max(k-dist(o),
    d(p,o)), lrd(p) = (n_p·1e9) DIV max(Σ reach, 1), lof(p) =
    (Σ_o lrd(o) · 1000) DIV (n_p · lrd(p)) — every step an exact
    BIGINT on both engines (truncating DIVs on non-negatives; the
    e9/e3 scales keep products under 2^63 to ~10^9 neighbors/node).

    Scale shape: the knn edges are N·k rows; k-dist/lrd/lof are two
    hash aggs and two N·k equi-joins on vec_id — no new corpus scan
    beyond the knn build itself."""
    edges = q_knn_graph(spark, sf_dir).select(
        "vec_id",
        "nbr_id",
        (F.lit(100000) - F.col("cos_e5")).alias("d"),
    )
    stats = edges.groupBy("vec_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_nbrs"),
        F.max("d").cast("long").alias("kdist"),
    )
    reach = (
        edges.join(
            stats.select(
                F.col("vec_id").alias("nbr_id"),
                F.col("kdist").alias("kdist_o"),
            ),
            "nbr_id",
        )
        .select(
            "vec_id",
            "nbr_id",
            F.greatest("kdist_o", "d").alias("reach"),
        )
        .groupBy("vec_id")
        .agg(F.sum("reach").cast("long").alias("sum_reach"))
    )
    lrd = (
        stats.join(reach, "vec_id")
        .select(
            "vec_id",
            "n_nbrs",
            "kdist",
            F.expr(
                "(n_nbrs * 1000000000) DIV greatest(sum_reach, 1)"
            ).alias("lrd_e9"),
        )
        .localCheckpoint(eager=False)
    )
    num = (
        edges.join(
            lrd.select(
                F.col("vec_id").alias("nbr_id"),
                F.col("lrd_e9").alias("lrd_o"),
            ),
            "nbr_id",
        )
        .groupBy("vec_id")
        .agg(F.sum("lrd_o").cast("long").alias("sum_lrd_o"))
    )
    return (
        lrd.join(num, "vec_id")
        .select(
            "vec_id",
            "n_nbrs",
            F.col("kdist").alias("kdist_e5"),
            "lrd_e9",
            F.expr(
                "(sum_lrd_o * 1000) DIV greatest(n_nbrs * lrd_e9, 1)"
            ).alias("lof_e3"),
        )
    )


def _lof_sql() -> str:
    """lof_outliers oracle: the FULL `_knn_graph_sql` spliced as a
    subquery CTE (the rrf/_bm25_sql precedent — kmeans/KNN constants
    flow in), then the identical integer k-dist/reach/lrd/lof
    chain."""
    return f"""
WITH knn AS (
{_knn_graph_sql()}
), edges AS (
  SELECT vec_id, nbr_id, 100000 - cos_e5 AS d FROM knn
), stats AS (
  SELECT vec_id, CAST(count(*) AS BIGINT) AS n_nbrs,
         CAST(max(d) AS BIGINT) AS kdist
  FROM edges GROUP BY 1
), reach AS (
  SELECT e.vec_id, CAST(sum(greatest(s.kdist, e.d)) AS BIGINT) AS sum_reach
  FROM edges e JOIN stats s ON e.nbr_id = s.vec_id
  GROUP BY 1
), lrd AS (
  SELECT s.vec_id, s.n_nbrs, s.kdist,
         CAST((s.n_nbrs * 1000000000) // greatest(r.sum_reach, 1)
              AS BIGINT) AS lrd_e9
  FROM stats s JOIN reach r ON s.vec_id = r.vec_id
), num AS (
  SELECT e.vec_id, CAST(sum(l.lrd_e9) AS BIGINT) AS sum_lrd_o
  FROM edges e JOIN lrd l ON e.nbr_id = l.vec_id
  GROUP BY 1
)
SELECT l.vec_id, l.n_nbrs,
       CAST(l.kdist AS BIGINT) AS kdist_e5,
       l.lrd_e9,
       CAST((n.sum_lrd_o * 1000) // greatest(l.n_nbrs * l.lrd_e9, 1)
            AS BIGINT) AS lof_e3
FROM lrd l JOIN num n ON l.vec_id = n.vec_id
"""


# Moore-Lewis spec — MIRRORED in `_moore_lewis_sql`; change together.
# In-domain = lang_guess()=='en' (the shared logreg label); both LMs
# live on the `_token_bucket` md5 64-bucket space with the source_kl
# Laplace form floor(ln((c+1)/(n+64.0))·1e3) — bucket-function or
# smoothing changes move dsir/source_kl/source_jsd AND this; selection
# is fixed-k (score DESC, doc_id).
MOLE_K = 100


def q_moore_lewis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moore-Lewis cross-entropy-difference selection (Moore & Lewis
    2010, "Intelligent Selection of Language Model Training Data") —
    the classic targeted-data selector DSIR descends from: score each
    document by ln p_in-domain(doc) − ln p_general(doc) and keep the
    top slice; documents the in-domain LM likes MORE than the general
    LM are the ones that pull a model toward the domain.  Differs
    from `dsir_weights` (importance ratio on raw bucket counts, no
    LM) and `rho_loss_select` (held-out loss difference): this is
    the likelihood-ratio ORIGINAL.  In-domain here = the 'en' slice.

    Cross-engine exact: both unigram LMs live on the shared 64-bucket
    hashed space with the source_kl Laplace e3-floors; the per-doc
    score Σ_b c_db·(lp_in_b − lp_gen_b) is pure BIGINT (signed);
    selection is fixed-k (score DESC, doc_id) TakeOrderedAndProject.
    The audit columns ship with it: is_en per kept doc — in-domain
    docs should dominate the top slice (the pytest lock).

    Scale shape: ONE corpus-scale (doc × ≤64 bucket) hash agg, two
    bounded 64-row LM tables broadcast back, a pure-map score join,
    fixed-k top-k.  Nothing driver-side but the 64-row literals."""
    hexmap = _hex_digit_map()
    base = (
        _docs(spark, sf_dir)
        .where(F.trim("text") != "")
        .select(
            "doc_id",
            F.when(lang_guess() == "en", F.lit(1))
            .otherwise(F.lit(0))
            .cast("long")
            .alias("is_en"),
            F.explode(_lm_tokens()).alias("tok"),
        )
        .select(
            "doc_id",
            "is_en",
            _token_bucket(F.col("tok"), hexmap).alias("bucket"),
        )
    )
    db = base.groupBy("doc_id", "is_en", "bucket").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    buckets = spark.range(64).select(F.col("id").cast("int").alias("bucket"))
    gen = (
        buckets.join(
            db.groupBy("bucket").agg(F.sum("c").cast("long").alias("cg")),
            "bucket",
            "left",
        )
        .select(
            "bucket", F.coalesce("cg", F.lit(0).cast("long")).alias("cg")
        )
    )
    ind = (
        buckets.join(
            db.where(F.col("is_en") == 1)
            .groupBy("bucket")
            .agg(F.sum("c").cast("long").alias("ci")),
            "bucket",
            "left",
        )
        .select(
            "bucket", F.coalesce("ci", F.lit(0).cast("long")).alias("ci")
        )
    )
    lm = (
        gen.join(ind, "bucket")
        .crossJoin(
            F.broadcast(
                gen.agg(F.sum("cg").cast("long").alias("ng")).crossJoin(
                    ind.agg(F.sum("ci").cast("long").alias("ni"))
                )
            )
        )
        .select(
            "bucket",
            (
                F.floor(
                    F.log((F.col("ci") + 1) / (F.col("ni") + F.lit(64.0)))
                    * 1000.0
                ).cast("long")
                - F.floor(
                    F.log((F.col("cg") + 1) / (F.col("ng") + F.lit(64.0)))
                    * 1000.0
                ).cast("long")
            ).alias("diff_e3"),
        )
    )
    scored = (
        db.join(F.broadcast(lm), "bucket")
        .groupBy("doc_id", "is_en")
        .agg(
            F.sum("c").cast("long").alias("n_toks"),
            F.sum(F.col("c") * F.col("diff_e3"))
            .cast("long")
            .alias("ce_diff_e3"),
        )
    )
    from pyspark.sql.window import Window as _W

    return (
        scored.orderBy(F.desc("ce_diff_e3"), "doc_id")
        .limit(MOLE_K)
        .select(
            "doc_id",
            "is_en",
            "n_toks",
            "ce_diff_e3",
            F.row_number()
            .over(_W.orderBy(F.desc("ce_diff_e3"), "doc_id"))
            .cast("long")
            .alias("rank"),
        )
    )


def _moore_lewis_sql(k: int | None = None) -> str:
    """moore_lewis oracle: the md5 64-bucket chain, the identical
    Laplace e3-floors for both LMs, signed BIGINT per-doc score,
    fixed-k (score DESC, doc_id)."""
    k = MOLE_K if k is None else k
    return _TEXT_CTE + f"""
, lbl AS (
  SELECT doc_id, CASE WHEN lang_guess = 'en' THEN CAST(1 AS BIGINT)
                      ELSE CAST(0 AS BIGINT) END AS is_en
  FROM feats
), toksx AS (
  SELECT d.doc_id,
         regexp_split_to_array(trim(lower(d.text)),
                               '[ \\t\\n\\x0B\\f\\r]+') AS t
  FROM documents d WHERE trim(d.text) <> ''
), tb AS (
  SELECT doc_id,
         ((strpos('0123456789abcdef', substr(md5(tk), 1, 1)) - 1) * 16
          + (strpos('0123456789abcdef', substr(md5(tk), 2, 1)) - 1)) % 64
           AS bucket
  FROM (SELECT doc_id, unnest(t) AS tk FROM toksx)
), db AS (
  SELECT b.doc_id, l.is_en, b.bucket, CAST(count(*) AS BIGINT) AS c
  FROM tb b JOIN lbl l ON b.doc_id = l.doc_id
  GROUP BY 1, 2, 3
), grid AS (SELECT unnest(generate_series(0, 63)) AS bucket),
gen AS (
  SELECT g.bucket, CAST(coalesce(sum(db.c), 0) AS BIGINT) AS cg
  FROM grid g LEFT JOIN db ON g.bucket = db.bucket GROUP BY 1
), ind AS (
  SELECT g.bucket, CAST(coalesce(sum(CASE WHEN db.is_en = 1 THEN db.c
                                     ELSE 0 END), 0) AS BIGINT) AS ci
  FROM grid g LEFT JOIN db ON g.bucket = db.bucket GROUP BY 1
), tots AS (
  SELECT (SELECT CAST(sum(cg) AS BIGINT) FROM gen) AS ng,
         (SELECT CAST(sum(ci) AS BIGINT) FROM ind) AS ni
), lm AS (
  SELECT gen.bucket,
         CAST(floor(ln((ind.ci + 1) / (tots.ni + 64.0)) * 1000.0) AS BIGINT)
         - CAST(floor(ln((gen.cg + 1) / (tots.ng + 64.0)) * 1000.0)
                AS BIGINT) AS diff_e3
  FROM gen JOIN ind ON gen.bucket = ind.bucket CROSS JOIN tots
), mls AS (
  SELECT db.doc_id, db.is_en,
         CAST(sum(db.c) AS BIGINT) AS n_toks,
         CAST(sum(db.c * lm.diff_e3) AS BIGINT) AS ce_diff_e3
  FROM db JOIN lm ON db.bucket = lm.bucket
  GROUP BY 1, 2
)
SELECT doc_id, is_en, n_toks, ce_diff_e3,
       CAST(row_number() OVER (ORDER BY ce_diff_e3 DESC, doc_id) AS BIGINT)
         AS rank
FROM mls
ORDER BY ce_diff_e3 DESC, doc_id LIMIT {k}
"""


# Winnowing fingerprint spec — MIRRORED in `_winnow_sql`; change
# together.  Token k-grams hashed via the md5-13-hex key (the
# bloom_dedup conv(_,16,10) == '0x'||_ pairing) reduced mod 2^35,
# packed with the gram position as key = h35·2^20 + (2^20−1−pos) so a
# single window MIN implements the rightmost-min-on-ties rule; POS_CAP
# bounds doc length (1M grams — a hard assumption documented below).
WINNOW_K = 4
WINNOW_W = 8
_WINNOW_POS_CAP = 1 << 20


def q_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson & Aiken
    2003 — the MOSS algorithm): hash every WINNOW_K-token gram, slide
    a WINNOW_W-hash window, keep the RIGHTMOST MINIMUM of each window
    — the selected set has guaranteed density ≤ 2/(w+1)·n and the
    core guarantee that any match of length ≥ w+k−1 grams shares at
    least one fingerprint.  The principled cousin of
    `doc_fingerprints` (fixed-stride rolling hash, no guarantee) and
    the local-similarity counterpart of `span_dedup` (which keys
    EVERY stride); per-doc output: gram count, fingerprint count,
    and the md5 digest of the sorted fingerprint multiset — the
    compact representation a MOSS-style matcher would join on.

    Cross-engine trick: among equal hashes the LARGER position must
    win (rightmost rule), so each gram ships as the single BIGINT
    key = h35·2^20 + (2^20−1−pos); one plain window MIN then IS the
    tie-broken selection — no struct mins, no argmax, pure BIGINT
    (h35 = md5-13-hex % 2^35 keeps the pack < 2^55).  Positions are
    1-based on BOTH engines (Spark posexplode+1 ↔ DuckDB
    generate_series); full windows only (pos ≤ max(1, n−w+1)), which
    for docs shorter than w degrades to the whole-doc minimum —
    winnowing's own convention.

    Scale shape: pure map → ONE per-doc window (partitioned by
    doc_id — no skew, bounded partitions) → distinct → per-doc agg;
    no joins, no driver data.  The 2^20 position cap is a documented
    hard assumption (1M grams/doc); web documents sit orders of
    magnitude below it."""
    from pyspark.sql.window import Window

    k, w = WINNOW_K, WINNOW_W
    toks = _lm_tokens()
    grams = (
        _docs(spark, sf_dir)
        .where(F.trim("text") != "")
        .select("doc_id", toks.alias("t"))
        .where(F.size("t") >= k)
        .select(
            "doc_id",
            F.size("t").alias("n_toks"),
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(1), F.size("t") - F.lit(k - 1)),
                    lambda i: F.concat_ws(
                        " ", F.slice(F.col("t"), i, F.lit(k))
                    ),
                )
            ).alias("p0", "gram"),
        )
        .select(
            "doc_id",
            (F.col("n_toks") - F.lit(k - 1)).alias("n_grams"),
            (F.col("p0") + 1).alias("pos"),
            (
                F.conv(F.substring(F.md5("gram"), 1, 13), 16, 10).cast(
                    "long"
                )
                % F.lit(1 << 35)
            ).alias("h35"),
        )
    )
    key = (
        F.col("h35") * F.lit(_WINNOW_POS_CAP)
        + F.lit(_WINNOW_POS_CAP - 1)
        - F.col("pos")
    )
    win = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(0, w - 1)
    sel = (
        grams.select(
            "doc_id",
            "n_grams",
            "pos",
            F.min(key).over(win).alias("k_min"),
        )
        .where(
            F.col("pos")
            <= F.greatest(F.lit(1), F.col("n_grams") - F.lit(w - 1))
        )
        .select("doc_id", "n_grams", "k_min")
        .distinct()
    )
    return sel.groupBy("doc_id").agg(
        F.max("n_grams").cast("long").alias("n_grams"),
        F.count(F.lit(1)).cast("long").alias("n_fp"),
        F.md5(
            F.concat_ws(
                ",",
                F.transform(
                    F.array_sort(F.collect_list("k_min")),
                    lambda x: x.cast("string"),
                ),
            )
        ).alias("fp_md5"),
    )


def _winnow_sql(k: int | None = None, w: int | None = None) -> str:
    """winnow_fingerprints oracle: the same gram/pack/window-min
    pipeline — DuckDB 1-based list slicing t[i:i+k-1] builds the
    identical gram strings, ROWS frame + QUALIFY the same full-window
    selection, list(DISTINCT .. ORDER BY ..) the same digest."""
    k = WINNOW_K if k is None else k
    w = WINNOW_W if w is None else w
    cap = _WINNOW_POS_CAP
    return f"""
WITH toks AS (
  SELECT doc_id,
         regexp_split_to_array(trim(lower(text)),
                               '[ \\t\\n\\x0B\\f\\r]+') AS t
  FROM documents WHERE trim(text) <> ''
), pos0 AS (
  SELECT doc_id, t,
         CAST(len(t) - {k - 1} AS BIGINT) AS n_grams,
         CAST(unnest(generate_series(1, len(t) - {k - 1})) AS BIGINT) AS pos
  FROM toks WHERE len(t) >= {k}
), grams AS (
  SELECT doc_id, n_grams, pos,
         CAST(('0x' || substr(md5(array_to_string(
                 t[pos:pos + {k - 1}], ' ')), 1, 13))
              AS BIGINT) % {1 << 35} AS h35
  FROM pos0
), mins AS (
  SELECT doc_id, n_grams,
         min(h35 * {cap} + {cap - 1} - pos)
           OVER (PARTITION BY doc_id ORDER BY pos
                 ROWS BETWEEN CURRENT ROW AND {w - 1} FOLLOWING) AS k_min
  FROM grams
  QUALIFY pos <= greatest(1, n_grams - {w - 1})
), sel AS (
  SELECT DISTINCT doc_id, n_grams, k_min FROM mins
)
SELECT doc_id,
       CAST(max(n_grams) AS BIGINT) AS n_grams,
       CAST(count(*) AS BIGINT) AS n_fp,
       md5(array_to_string(list_transform(
             list(DISTINCT k_min ORDER BY k_min),
             x -> CAST(x AS VARCHAR)), ',')) AS fp_md5
FROM sel GROUP BY 1
"""


# Dawid-Skene spec — MIRRORED in `_dawid_skene_sql`; change together.
# Three synthetic annotators over the gold lang_guess=='en' label with
# INJECTED error rates: flip when the md5('ds{j}|'‖doc_id)-13-hex
# permille < ERR_j.  The draws MUST be md5, not knuth — knuth is
# LINEAR, so knuth(doc_id·m+j) across j is perfectly correlated and
# silently violates DS's conditional-independence assumption (measured:
# pure-class label patterns, EM worse than majority vote).  The EM
# should RECOVER ≈ these rates — the test's validation.  M-steps are
# exact integer rationals (Python bignum ↔ HUGEINT), E-steps the
# bit-exact IEEE ×,÷ class e6-floored.
DS_ERR = (100, 200, 300)
DS_ITERS = 5


def _ds_em(combos: dict[tuple[int, int, int], int]):
    """Dawid-Skene EM over the 8-combo histogram in exact ints +
    IEEE doubles — the arithmetic is MIRRORED expression-for-
    expression in `_dawid_skene_sql`'s unrolled CTEs."""
    from math import floor

    mu = {c: ((c[0] + c[1] + c[2]) * 1000000) // 3 for c in combos}
    ntot = sum(combos.values())
    pi = a = b = None
    for _ in range(DS_ITERS):
        s1 = sum(n * mu[c] for c, n in combos.items())
        s0 = sum(n * (1000000 - mu[c]) for c, n in combos.items())
        pi = s1 // ntot
        a = [
            (
                sum(n * mu[c] for c, n in combos.items() if c[j] == 1)
                * 1000000
            )
            // max(s1, 1)
            for j in range(3)
        ]
        b = [
            (
                sum(
                    n * (1000000 - mu[c])
                    for c, n in combos.items()
                    if c[j] == 0
                )
                * 1000000
            )
            // max(s0, 1)
            for j in range(3)
        ]
        for c in combos:
            p1 = pi / 1000000.0
            p0 = (1000000 - pi) / 1000000.0
            for j in range(3):
                p1 = p1 * (
                    a[j] / 1000000.0
                    if c[j] == 1
                    else (1000000 - a[j]) / 1000000.0
                )
                p0 = p0 * (
                    (1000000 - b[j]) / 1000000.0
                    if c[j] == 1
                    else b[j] / 1000000.0
                )
            mu[c] = floor(p1 / (p1 + p0) * 1000000.0 + 0.5)
    return mu, pi, a, b


def q_dawid_skene(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dawid-Skene annotator aggregation (Dawid & Skene 1979; the
    crowd-labeling EM every labeling pipeline reinvents): three
    deterministic synthetic annotators report the gold
    lang_guess=='en' label corrupted at ``DS_ERR`` knuth-permille
    flip rates; EM jointly estimates class prior π, per-annotator
    sensitivity α_j / specificity β_j, and the per-label-pattern
    posterior — WITHOUT seeing gold.  Output: one row per observed
    (y1,y2,y3) pattern with its count and posterior, the fitted
    parameters repeated as columns (the model card).  The weighted
    posterior beats naive majority vote exactly when annotator
    reliabilities differ — which the injected 10/20/30% rates
    guarantee.

    Cross-engine: the corpus collapses to the ≤8-row label-pattern
    histogram (ONE agg), so EM runs driver-side in EXACT arithmetic
    (the bradley_terry / isotonic bounded-table precedent): M-steps
    are integer rationals (Python bignum ↔ DuckDB HUGEINT, all
    operands non-negative so `//` agrees), E-steps are the bit-exact
    IEEE ×,÷ class — left-assoc factor products mirrored textually —
    e6-floored (stable +0.5 form).

    Scale shape: one corpus-scale map + hash agg to ≤8 rows; the
    O(ITERS·8) EM never touches the corpus."""
    g = F.when(lang_guess() == "en", F.lit(1)).otherwise(F.lit(0))
    docs = _docs(spark, sf_dir).select(g.alias("g"), "doc_id")

    def draw(j: int) -> F.Column:
        return (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit(f"ds{j}|"),
                            F.col("doc_id").cast("string"),
                        )
                    ),
                    1,
                    13,
                ),
                16,
                10,
            ).cast("long")
            % 1000
        )

    ys = docs.select(
        *[
            F.when(draw(j) < DS_ERR[j], 1 - F.col("g"))
            .otherwise(F.col("g"))
            .alias(f"y{j + 1}")
            for j in range(3)
        ]
    )
    hist = (
        ys.groupBy("y1", "y2", "y3")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .collect()
    )
    combos = {(r["y1"], r["y2"], r["y3"]): r["n"] for r in hist}
    mu, pi, a, b = _ds_em(combos)
    rows = [
        (
            c[0],
            c[1],
            c[2],
            n,
            mu[c],
            pi,
            a[0],
            b[0],
            a[1],
            b[1],
            a[2],
            b[2],
        )
        for c, n in sorted(combos.items())
    ]
    return spark.createDataFrame(
        rows,
        "y1 long, y2 long, y3 long, n_docs long, mu_e6 long, pi_e6 long,"
        " a1_e6 long, b1_e6 long, a2_e6 long, b2_e6 long,"
        " a3_e6 long, b3_e6 long",
    )


def _dawid_skene_sql(iters: int | None = None) -> str:
    """dawid_skene oracle: the knuth-flip annotator construction off
    the shared feats chain, the ≤8-row histogram, then ITERS unrolled
    (M, E) CTE pairs — every one MATERIALIZED (the BPE chained-CTE
    lesson) — mirroring `_ds_em` expression-for-expression."""
    iters = DS_ITERS if iters is None else iters
    flips = ", ".join(
        f"CASE WHEN CAST(('0x' || substr(md5('ds{j}|' ||"
        " CAST(doc_id AS VARCHAR)), 1, 13)) AS BIGINT) % 1000"
        f" < {DS_ERR[j]} THEN 1 - g ELSE g END AS y{j + 1}"
        for j in range(3)
    )
    parts = [
        _scored_feats_ctes(),
        """lbl AS (
  SELECT doc_id, CASE WHEN lang_guess = 'en' THEN 1 ELSE 0 END AS g
  FROM feats
)""",
        f"ys AS (SELECT {flips} FROM lbl)",
        """mu0 AS MATERIALIZED (
  SELECT y1, y2, y3, CAST(count(*) AS BIGINT) AS n,
         CAST(((y1 + y2 + y3) * 1000000) // 3 AS BIGINT) AS mu
  FROM ys GROUP BY 1, 2, 3
)""",
    ]
    for t in range(1, iters + 1):
        prev = f"mu{t - 1}"
        ajs = ", ".join(
            f"CAST((sum(CASE WHEN y{j + 1} = 1 THEN n * mu ELSE 0 END)"
            f" * 1000000) // greatest(sum(n * mu), 1) AS BIGINT) AS a{j + 1}"
            for j in range(3)
        )
        bjs = ", ".join(
            f"CAST((sum(CASE WHEN y{j + 1} = 0 THEN n * (1000000 - mu)"
            " ELSE 0 END) * 1000000)"
            " // greatest(sum(n * (1000000 - mu)), 1) AS BIGINT)"
            f" AS b{j + 1}"
            for j in range(3)
        )
        p1f = " * ".join(
            f"(CASE WHEN y{j + 1} = 1 THEN CAST(a{j + 1} AS DOUBLE)"
            f" / 1000000.0 ELSE CAST(1000000 - a{j + 1} AS DOUBLE)"
            " / 1000000.0 END)"
            for j in range(3)
        )
        p0f = " * ".join(
            f"(CASE WHEN y{j + 1} = 1 THEN CAST(1000000 - b{j + 1}"
            f" AS DOUBLE) / 1000000.0 ELSE CAST(b{j + 1} AS DOUBLE)"
            " / 1000000.0 END)"
            for j in range(3)
        )
        parts.append(
            f"""p{t} AS MATERIALIZED (
  SELECT CAST(sum(n * mu) // sum(n) AS BIGINT) AS pi, {ajs}, {bjs}
  FROM {prev}
), mu{t} AS MATERIALIZED (
  SELECT m.y1, m.y2, m.y3, m.n,
         CAST(floor(
           (CAST(pi AS DOUBLE) / 1000000.0 * {p1f})
           / ((CAST(pi AS DOUBLE) / 1000000.0 * {p1f})
              + (CAST(1000000 - pi AS DOUBLE) / 1000000.0 * {p0f}))
           * 1000000.0 + 0.5) AS BIGINT) AS mu
  FROM {prev} m, p{t}
)"""
        )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
SELECT m.y1, m.y2, m.y3, m.n AS n_docs, m.mu AS mu_e6,
       p.pi AS pi_e6, p.a1 AS a1_e6, p.b1 AS b1_e6,
       p.a2 AS a2_e6, p.b2 AS b2_e6, p.a3 AS a3_e6, p.b3 AS b3_e6
FROM mu{iters} m, p{iters} p
"""
    )


# Co-occurrence/PPMI spec — MIRRORED in `_cooc_ppmi_sql`; change
# together.  Windowed skip pairs (t_i, t_{i+d}) for d in 1..COOC_W
# over the RAW `_lm_tokens()` stream (pairing before the vocab filter
# — GloVe's convention), stored unordered via (least, greatest);
# vocab = top-COOC_VOCAB_K unigrams by (cnt DESC, tok) (the
# BIGRAM_VOCAB_K sizing rule — and the vocab cap IS the output bound:
# the full ≤V(V+1)/2-row matrix is emitted, ranked (c_ab DESC, a, b),
# no silent top-k cut); marginals are ENDPOINT counts from the
# in-vocab pair table itself (an (a,a) pair contributes 2), total T =
# Σ c_ab; pmi_e3 is the ONE expression text
# ln((c_ab·T)/(c_a·c_b)) with every operand cast DOUBLE BEFORE
# multiplying (the source_keyness rule — BIGINT products would
# overflow), e3-floored.
COOC_W = 3
COOC_VOCAB_K = 40


def _cooc_cab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The shared windowed co-occurrence count table (a, b, c_ab) of
    `cooc_ppmi` and `textrank_keywords` (edit once, both oracles
    move): skip pairs over the raw `_lm_tokens` stream via pure array
    ops, unordered least/greatest, filtered to the top-COOC_VOCAB_K
    vocab (literal isin), hash-aggregated onto the bounded ≤V²
    key space and lazily checkpointed (feeds multiple consumers)."""
    docs = (
        _docs(spark, sf_dir)
        .select("doc_id", "text")
        .where(F.trim("text") != "")
    )
    toks = _lm_tokens()
    vocab_rows = (
        docs.select(F.explode(toks).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), "tok")
        .limit(COOC_VOCAB_K)
        .collect()
    )
    vocab = sorted(r["tok"] for r in vocab_rows)

    arrays = []
    for d in range(1, COOC_W + 1):
        n = F.greatest(F.size(toks) - d, F.lit(0))
        arrays.append(
            F.zip_with(
                F.slice(toks, 1, n),
                F.slice(toks, d + 1, n),
                lambda x, y: F.struct(
                    F.least(x, y).alias("a"), F.greatest(x, y).alias("b")
                ),
            )
        )
    pe = (
        docs.select(F.explode(F.concat(*arrays)).alias("p"))
        .select(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .where(F.col("a").isin(vocab) & F.col("b").isin(vocab))
    )
    return (
        pe.groupBy("a", "b")
        .agg(F.count(F.lit(1)).cast("long").alias("c_ab"))
        .localCheckpoint(eager=False)  # bounded ≤V² — feeds 3 consumers
    )


def q_cooc_ppmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed co-occurrence counts + PPMI — the word-vector
    preparation table (GloVe's X matrix; Levy & Goldberg 2014's
    PPMI-SVD equivalence makes this THE classical embedding substrate)
    and the collocation detector curation pipelines read: for every
    unordered in-vocab token pair within a ``COOC_W``-token window,
    the co-occurrence count, endpoint marginals, and the e3-floored
    (P)PMI.

    Cross-engine: pairs are built as pure array ops (Spark
    slice+zip_with per offset d ↔ DuckDB generate_series with t[i],
    t[i+d] — the lsh_bucket_stats 0/1-based indexing note: the pair
    MULTISETS are identical), unordered via least/greatest (UTF-8
    byte order == codepoint order, identical in both engines);
    marginals/total come from the BOUNDED ≤V² pair table; the PMI is
    the mirrored one-expression ln on identical doubles.

    Scale shape: ONE token-pair explode → hash agg onto the bounded
    vocab×vocab key space (map-side partial aggs absorb the stream;
    the in-vocab filter prunes before the shuffle); marginals, total,
    and the top-k rank all run on the ≤V(V+1)/2-row pair table —
    metadata scale.  The vocab itself is one bounded hash agg shipped
    as a literal isin list (the lm_vocab precedent)."""
    cab = _cooc_cab(spark, sf_dir)
    marg = (
        cab.select(F.col("a").alias("tok"), "c_ab")
        .unionAll(cab.select(F.col("b").alias("tok"), "c_ab"))
        .groupBy("tok")
        .agg(F.sum("c_ab").cast("long").alias("c_t"))
    )
    tot = cab.agg(F.sum("c_ab").cast("long").alias("t_pairs"))
    pmi = F.floor(
        F.lit(1000.0)
        * F.log(
            (F.col("c_ab").cast("double") * F.col("t_pairs").cast("double"))
            / (F.col("c_a").cast("double") * F.col("c_b").cast("double"))
        )
    ).cast("long")
    from pyspark.sql.window import Window

    ranked = (
        cab.join(
            marg.select(F.col("tok").alias("a"), F.col("c_t").alias("c_a")),
            "a",
        )
        .join(
            marg.select(F.col("tok").alias("b"), F.col("c_t").alias("c_b")),
            "b",
        )
        .crossJoin(tot)
        .withColumn("pmi_e3", pmi)
        .withColumn("ppmi_e3", F.greatest(F.col("pmi_e3"), F.lit(0)))
        .withColumn(
            "rank",
            F.row_number()
            .over(
                Window.orderBy(F.col("c_ab").desc(), "a", "b")
            )
            .cast("long"),
        )
    )
    return ranked.select(
        "rank", "a", "b", "c_ab", "c_a", "c_b", "pmi_e3", "ppmi_e3"
    )


def _cooc_ppmi_sql(w: int = COOC_W, vocab_k: int = COOC_VOCAB_K) -> str:
    """cooc_ppmi oracle: tokens via the shared regexp split, skip
    pairs via generate_series per offset (1-based t[i]/t[i+d] — the
    same pair multiset as Spark's 0-based slices), the top-K unigram
    vocab CTE, endpoint marginals over the bounded pair table, and
    the mirrored one-expression PMI."""
    offsets = " UNION ALL ".join(
        f"SELECT doc_id, t, {d} AS d FROM toks" for d in range(1, w + 1)
    )
    return f"""
WITH toks AS MATERIALIZED (
  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '[ \\t\\n\\x0B\\f\\r]+') AS t
  FROM documents WHERE trim(text) <> ''
), vocab AS MATERIALIZED (
  SELECT tok FROM (
    SELECT unnest(t) AS tok FROM toks
  ) GROUP BY 1 ORDER BY count(*) DESC, tok LIMIT {vocab_k}
), offs AS ({offsets}
), pe AS (
  SELECT least(p.x, p.y) AS a, greatest(p.x, p.y) AS b
  FROM (
    SELECT unnest(list_transform(generate_series(1, len(t) - d),
                                 i -> {{'x': t[i], 'y': t[i+d]}})) AS p
    FROM offs WHERE len(t) > d
  )
  WHERE p.x IN (SELECT tok FROM vocab) AND p.y IN (SELECT tok FROM vocab)
), cab AS MATERIALIZED (
  SELECT a, b, CAST(count(*) AS BIGINT) AS c_ab FROM pe GROUP BY 1, 2
), marg AS MATERIALIZED (
  SELECT tok, CAST(sum(c_ab) AS BIGINT) AS c_t FROM (
    SELECT a AS tok, c_ab FROM cab
    UNION ALL
    SELECT b AS tok, c_ab FROM cab
  ) GROUP BY 1
), tot AS (
  SELECT CAST(sum(c_ab) AS BIGINT) AS t_pairs FROM cab
)
SELECT rank, a, b, c_ab, c_a, c_b, pmi_e3,
       greatest(pmi_e3, CAST(0 AS BIGINT)) AS ppmi_e3
FROM (
  SELECT
    CAST(row_number() OVER (ORDER BY c.c_ab DESC, c.a, c.b) AS BIGINT)
      AS rank,
    c.a, c.b, c.c_ab, ma.c_t AS c_a, mb.c_t AS c_b,
    CAST(floor(1000.0 * ln(
      (CAST(c.c_ab AS DOUBLE) * CAST(t.t_pairs AS DOUBLE))
      / (CAST(ma.c_t AS DOUBLE) * CAST(mb.c_t AS DOUBLE))
    )) AS BIGINT) AS pmi_e3
  FROM cab c
  JOIN marg ma ON c.a = ma.tok
  JOIN marg mb ON c.b = mb.tok
  CROSS JOIN tot t
)
"""


# TextRank spec — MIRRORED in `_textrank_sql`; change together.
# Rides the `_cooc_cab` chain (COOC_W/COOC_VOCAB_K flow in — changing
# the window or vocab moves the cooc_ppmi AND textrank oracles).
# Graph: both directions of every non-self co-occurrence pair; edge
# shares s_ji = (w·1e6) DIV W_j are normalized ONCE before the
# iterations so every later magnitude is bounded regardless of corpus
# size (the bradley_terry scaling rule); ranks are e9 BIGINTs with
# the pagerank-style update r = 150000000 + (85·inc) DIV 100, inc =
# (Σ_j r_j·s_ji) DIV 1e6 — one floor AFTER the sum.
TEXTRANK_ITERS = 10


def q_textrank_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TextRank keyword centrality (Mihalcea & Tarau 2004) — weighted
    PageRank over the word co-occurrence graph, THE classic
    graph-based keyword extractor and the corpus-level complement of
    `rake_keywords` (RAKE scores phrases by degree/frequency within
    docs; TextRank ranks vocabulary by global random-walk
    centrality): per vocab token, its co-occurrence strength and the
    converged e9 rank, ordered by (rank DESC, token).

    Exact cross-engine integers end to end: the graph comes from the
    shared `_cooc_cab` counts; edge shares are e6-floored BEFORE the
    loop (bounded at any corpus size — raw w·r products would
    overflow at 1e12 pairs); each iteration is the all-BIGINT
    pagerank-form update, so Spark's driver-side Python-int replay of
    the collected ≤V² share table (the bradley_terry/isotonic
    driver-literal precedent) equals DuckDB's unrolled per-iteration
    CTEs bit for bit.

    Scale shape: the corpus-scale work is ONE pair hash agg (the
    cooc_ppmi plan); shares/iterations run on the bounded ≤V² edge
    table — the O(V²·iters) loop never touches the corpus."""
    cab = _cooc_cab(spark, sf_dir)
    edges = (
        cab.where(F.col("a") != F.col("b"))
        .select(F.col("a").alias("j"), F.col("b").alias("i"), "c_ab")
        .unionAll(
            cab.where(F.col("a") != F.col("b")).select(
                F.col("b").alias("j"), F.col("a").alias("i"), "c_ab"
            )
        )
    )
    wj = edges.groupBy("j").agg(F.sum("c_ab").cast("long").alias("w_j"))
    sh = (
        edges.join(wj, "j")
        .select(
            "j", "i", "w_j", F.expr("(c_ab * 1000000) DIV w_j").alias("s")
        )
        .collect()  # bounded ≤V² rows — metadata scale
    )
    strength = {}
    out_sh: dict[str, list[tuple[str, int]]] = {}
    for r in sh:
        strength[r["j"]] = r["w_j"]
        out_sh.setdefault(r["j"], []).append((r["i"], r["s"]))
    nodes = sorted(strength)
    rank = {t: 10**9 for t in nodes}
    for _it in range(TEXTRANK_ITERS):
        inc = dict.fromkeys(nodes, 0)
        for j, outs in out_sh.items():
            rj = rank[j]
            for i, sv in outs:
                inc[i] += rj * sv
        rank = {t: 150000000 + (85 * (inc[t] // 10**6)) // 100 for t in nodes}
    order = sorted(nodes, key=lambda t: (-rank[t], t))
    return spark.createDataFrame(
        [
            (k + 1, t, strength[t], rank[t])
            for k, t in enumerate(order)
        ],
        "rank long, token string, w_strength long, r_e9 long",
    )


def _textrank_sql(
    w: int = COOC_W, vocab_k: int = COOC_VOCAB_K, iters: int = TEXTRANK_ITERS
) -> str:
    """textrank_keywords oracle: the cooc_ppmi CTE chain to cab, the
    doubled-direction edge table, e6-floored shares, and the unrolled
    all-BIGINT pagerank-form iterations over the bounded node set."""
    offsets = " UNION ALL ".join(
        f"SELECT doc_id, t, {d} AS d FROM toks" for d in range(1, w + 1)
    )
    its = []
    for k in range(1, iters + 1):
        its.append(
            f"""r{k} AS (
  SELECT n.tok,
         CAST(150000000 + (85 * (coalesce(inc.v, 0) // 1000000)) // 100
              AS BIGINT) AS r
  FROM nodes n LEFT JOIN (
    SELECT s.i AS tok, CAST(sum(p.r * s.s) AS BIGINT) AS v
    FROM sh s JOIN r{k - 1} p ON s.j = p.tok GROUP BY 1
  ) inc ON n.tok = inc.tok
)"""
        )
    return f"""
WITH toks AS MATERIALIZED (
  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '[ \\t\\n\\x0B\\f\\r]+') AS t
  FROM documents WHERE trim(text) <> ''
), vocab AS MATERIALIZED (
  SELECT tok FROM (
    SELECT unnest(t) AS tok FROM toks
  ) GROUP BY 1 ORDER BY count(*) DESC, tok LIMIT {vocab_k}
), offs AS ({offsets}
), pe AS (
  SELECT least(p.x, p.y) AS a, greatest(p.x, p.y) AS b
  FROM (
    SELECT unnest(list_transform(generate_series(1, len(t) - d),
                                 i -> {{'x': t[i], 'y': t[i+d]}})) AS p
    FROM offs WHERE len(t) > d
  )
  WHERE p.x IN (SELECT tok FROM vocab) AND p.y IN (SELECT tok FROM vocab)
), cab AS MATERIALIZED (
  SELECT a, b, CAST(count(*) AS BIGINT) AS c_ab FROM pe GROUP BY 1, 2
), edges AS (
  SELECT a AS j, b AS i, c_ab FROM cab WHERE a <> b
  UNION ALL
  SELECT b AS j, a AS i, c_ab FROM cab WHERE a <> b
), wj AS MATERIALIZED (
  SELECT j, CAST(sum(c_ab) AS BIGINT) AS w_j FROM edges GROUP BY 1
), sh AS MATERIALIZED (
  SELECT e.j, e.i, (e.c_ab * 1000000) // w.w_j AS s
  FROM edges e JOIN wj w USING (j)
), nodes AS (
  SELECT j AS tok FROM wj
), r0 AS (
  SELECT tok, CAST(1000000000 AS BIGINT) AS r FROM nodes
),
{",".join(its)}
SELECT CAST(row_number() OVER (ORDER BY r.r DESC, r.tok) AS BIGINT) AS rank,
       r.tok AS token, w.w_j AS w_strength, r.r AS r_e9
FROM r{iters} r JOIN wj w ON r.tok = w.j
"""


# SGNS word-embedding spec — MIRRORED in `_sgns_sql`; change
# together.  Rides the `_cooc_cab` chain (COOC_W/COOC_VOCAB_K flow
# in — the THIRD consumer with cooc_ppmi/textrank).  Full-batch
# skip-gram with negative sampling: positives = both directions of
# every non-self co-occurrence pair weighted c_ab; ONE deterministic
# negative per positive (context shifted SGNS_NEG_JUMP places in the
# alphabetical vocab ring — a rank equi-join, no RNG); init from the
# knuth hash of (rank-1)·2D+d as exact e6 rationals; per-iteration
# MEAN gradients are 6-dp floor-stable (the logreg discipline — exp
# ulp + sum-order noise stays ~1e-12, far under the 5e-7 grid), so
# the parameter matrices evolve as identical doubles on both engines.
SGNS_DIM = 4
SGNS_ITERS = 3
SGNS_NEG_JUMP = 7


def q_sgns_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word2vec SGNS embedding training as a first-class query
    (Mikolov et al. 2013, the full-batch deterministic form) — the
    third trained model whose TRAINING LOOP is value-hash-checked
    (kmeans = clustering, logreg = classification, this = word
    embeddings): skip-gram pairs from the shared `_cooc_cab` window
    counts, one rank-ring negative per positive, SGNS_ITERS
    full-batch GD steps on mean gradients, output = both final
    parameter matrices as (rank, token, dim, v_e6, u_e6).

    Cross-engine: the pair table is bounded ≤4V², so Spark collects
    it and replays training in exact Python floats (the
    textrank/bradley_terry driver-literal precedent) while DuckDB
    unrolls per-iteration CTE pairs; every update applies 6-dp
    floor-stable MEAN gradients (floor(Σ w·err·x / W·1e6+0.5)/1e6 —
    identical op order), so v/u stay identical doubles and the final
    e6 floors are exact integers.

    Scale shape: the corpus-scale work is ONE pair hash agg (the
    cooc_ppmi plan); training runs on the bounded V×D parameter set
    — O(V²·D·iters) driver/bounded-CTE math that never touches the
    corpus."""
    import math

    cab = [
        (r["a"], r["b"], r["c_ab"])
        for r in _cooc_cab(spark, sf_dir).where(F.col("a") != F.col("b")).collect()
    ]
    nodes = sorted({a for a, _, _ in cab} | {b for _, b, _ in cab})
    v_cnt = len(nodes)
    rank = {t: i + 1 for i, t in enumerate(nodes)}
    pairs = []
    for a, b, w in cab:
        for c, o in ((a, b), (b, a)):
            pairs.append((c, o, w, 1.0))
            neg = nodes[(rank[o] - 1 + SGNS_NEG_JUMP) % v_cnt]
            pairs.append((c, neg, w, 0.0))
    w_tot = sum(w for _, _, w, _ in pairs)

    def kn(x: int) -> int:
        return ((x % 1000000007) * 2654435761) % 1000000007

    def init(r: int, d: int, off: int) -> float:
        return (kn((r - 1) * 2 * SGNS_DIM + off + d) % 2001 - 1000) / 1000000.0

    v = {t: [init(rank[t], d, 0) for d in range(SGNS_DIM)] for t in nodes}
    u = {
        t: [init(rank[t], d, SGNS_DIM) for d in range(SGNS_DIM)]
        for t in nodes
    }

    def stable6(x: float) -> float:
        return math.floor(x * 1000000 + 0.5) / 1000000

    for _ in range(SGNS_ITERS):
        gv = {t: [0.0] * SGNS_DIM for t in nodes}
        gu = {t: [0.0] * SGNS_DIM for t in nodes}
        for c, o, w, y in pairs:
            dot = 0.0
            for d in range(SGNS_DIM):
                dot += v[c][d] * u[o][d]
            err = 1.0 / (1.0 + math.exp(-dot)) - y
            for d in range(SGNS_DIM):
                gv[c][d] += w * err * u[o][d]
                gu[o][d] += w * err * v[c][d]
        for t in nodes:
            for d in range(SGNS_DIM):
                v[t][d] = v[t][d] - 0.5 * stable6(gv[t][d] / w_tot * 1.0)
                u[t][d] = u[t][d] - 0.5 * stable6(gu[t][d] / w_tot * 1.0)
    rows = []
    for t in nodes:
        for d in range(SGNS_DIM):
            rows.append(
                (
                    rank[t],
                    t,
                    d,
                    math.floor(v[t][d] * 1000000 + 0.5),
                    math.floor(u[t][d] * 1000000 + 0.5),
                )
            )
    return spark.createDataFrame(
        rows, "rank long, token string, dim long, v_e6 long, u_e6 long"
    )


def _sgns_sql(
    w: int = COOC_W,
    vocab_k: int = COOC_VOCAB_K,
    dim: int = SGNS_DIM,
    iters: int = SGNS_ITERS,
    jump: int = SGNS_NEG_JUMP,
) -> str:
    """sgns_embeddings oracle: the cooc CTE chain to cab, the
    alphabetical rank ring, knuth-rational init, and unrolled
    (score, grad, update) CTE triples with the logreg-form 6-dp
    floor-stable mean gradients."""
    offsets = " UNION ALL ".join(
        f"SELECT doc_id, t, {d} AS d FROM toks" for d in range(1, w + 1)
    )
    kn = "((({x}) % 1000000007) * 2654435761) % 1000000007"
    v_init = ", ".join(
        "CAST(("
        + kn.format(x=f"(rank - 1) * {2 * dim} + {d}")
        + f" % 2001 - 1000) AS DOUBLE) / 1000000.0 AS v{d}"
        for d in range(dim)
    )
    u_init = ", ".join(
        "CAST(("
        + kn.format(x=f"(rank - 1) * {2 * dim} + {dim + d}")
        + f" % 2001 - 1000) AS DOUBLE) / 1000000.0 AS u{d}"
        for d in range(dim)
    )
    dot = " + ".join(f"v.v{d} * u.u{d}" for d in range(dim))
    its = []
    for k in range(1, iters + 1):
        gvs = ", ".join(
            f"floor(sum(s.w * s.err * s.u{d}) / (SELECT w_tot FROM wt)"
            f" * 1000000 + 0.5) / 1000000 AS g{d}"
            for d in range(dim)
        )
        gus = ", ".join(
            f"floor(sum(s.w * s.err * s.v{d}) / (SELECT w_tot FROM wt)"
            f" * 1000000 + 0.5) / 1000000 AS g{d}"
            for d in range(dim)
        )
        vups = ", ".join(
            f"p.v{d} - 0.5 * coalesce(g.g{d}, 0.0) AS v{d}"
            for d in range(dim)
        )
        uups = ", ".join(
            f"p.u{d} - 0.5 * coalesce(g.g{d}, 0.0) AS u{d}"
            for d in range(dim)
        )
        svs = ", ".join(f"v.v{d}" for d in range(dim))
        sus = ", ".join(f"u.u{d}" for d in range(dim))
        its.append(
            f"""s{k} AS (
  SELECT p.c, p.o, p.w, p.y,
         1.0 / (1.0 + exp(-({dot}))) - p.y AS err,
         {svs}, {sus}
  FROM pairs p JOIN v{k - 1} v ON p.c = v.tok
               JOIN u{k - 1} u ON p.o = u.tok
), gv{k} AS (
  SELECT s.c AS tok, {gvs} FROM s{k} s GROUP BY 1
), gu{k} AS (
  SELECT s.o AS tok, {gus} FROM s{k} s GROUP BY 1
), v{k} AS (
  SELECT p.tok, p.rank, {vups}
  FROM v{k - 1} p LEFT JOIN gv{k} g ON p.tok = g.tok
), u{k} AS (
  SELECT p.tok, p.rank, {uups}
  FROM u{k - 1} p LEFT JOIN gu{k} g ON p.tok = g.tok
)"""
        )
    branches = "\nUNION ALL\n".join(
        f"""SELECT v.rank, v.tok AS token, CAST({d} AS BIGINT) AS dim,
       CAST(floor(v.v{d} * 1000000 + 0.5) AS BIGINT) AS v_e6,
       CAST(floor(u.u{d} * 1000000 + 0.5) AS BIGINT) AS u_e6
FROM v{iters} v JOIN u{iters} u USING (tok)"""
        for d in range(dim)
    )
    return f"""
WITH toks AS MATERIALIZED (
  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '[ \\t\\n\\x0B\\f\\r]+') AS t
  FROM documents WHERE trim(text) <> ''
), vocab AS MATERIALIZED (
  SELECT tok FROM (
    SELECT unnest(t) AS tok FROM toks
  ) GROUP BY 1 ORDER BY count(*) DESC, tok LIMIT {vocab_k}
), offs AS ({offsets}
), pe AS (
  SELECT least(p.x, p.y) AS a, greatest(p.x, p.y) AS b
  FROM (
    SELECT unnest(list_transform(generate_series(1, len(t) - d),
                                 i -> {{'x': t[i], 'y': t[i+d]}})) AS p
    FROM offs WHERE len(t) > d
  )
  WHERE p.x IN (SELECT tok FROM vocab) AND p.y IN (SELECT tok FROM vocab)
), cab AS MATERIALIZED (
  SELECT a, b, CAST(count(*) AS BIGINT) AS c_ab FROM pe
  WHERE a <> b GROUP BY 1, 2
), nodes AS MATERIALIZED (
  SELECT tok, CAST(row_number() OVER (ORDER BY tok) AS BIGINT) AS rank
  FROM (SELECT a AS tok FROM cab UNION SELECT b AS tok FROM cab)
), nv AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes
), pos AS (
  SELECT a AS c, b AS o, c_ab AS w FROM cab
  UNION ALL
  SELECT b AS c, a AS o, c_ab AS w FROM cab
), pairs AS MATERIALIZED (
  SELECT c, o, w, 1.0 AS y FROM pos
  UNION ALL
  SELECT p.c, n2.tok AS o, p.w, 0.0 AS y
  FROM pos p JOIN nodes n1 ON p.o = n1.tok
             JOIN nodes n2
               ON n2.rank = ((n1.rank - 1 + {jump})
                             % (SELECT n FROM nv)) + 1
), wt AS (
  SELECT CAST(sum(w) AS BIGINT) AS w_tot FROM pairs
), v0 AS (
  SELECT tok, rank, {v_init} FROM nodes
), u0 AS (
  SELECT tok, rank, {u_init} FROM nodes
),
{",".join(its)}
{branches}
"""


# PPMI-SVD spec — MIRRORED in `_ppmi_svd_sql`; change together.
# The FOURTH `_cooc_cab` consumer (COOC_W/COOC_VOCAB_K flow in).
# Top-2 eigenpairs of the symmetric PPMI matrix by power iteration
# with Hotelling deflation; every iterate is normalized then 6-dp
# floor-stable rounded (the kmeans/sgns grid — ln-ulp and sum-order
# noise in the matvec stay ~1e-13, far under 5e-7); λ ships e6 and
# deflation uses the EXACT λ_e6/1e6 double so M₂ is identical on
# both engines; the power-iteration sign follows the deterministic
# knuth init.
PSVD_ITERS = 6


def q_ppmi_svd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-based word embeddings via truncated eigendecomposition
    of the PPMI matrix (Levy & Goldberg 2014, "Neural Word Embedding
    as Implicit Matrix Factorization" — the paper that showed SGNS
    IS this factorization): the two LARGEST-MAGNITUDE eigenpairs of
    the symmetric vocabulary PPMI matrix by deflated power iteration
    (PPMI is indefinite, so λ2 may be negative — the |λ|-dominant
    pair is what power iteration converges to, and the test locks
    that reading).  Completes
    the trained-model trilogy (kmeans = clustering, logreg =
    classification, sgns = predictive embeddings, this = the
    count-based embeddings they implicitly factorize) — comparing
    sgns columns with these is the Levy-Goldberg experiment as a
    query pair.

    Cross-engine: the matrix entries are the cooc_ppmi one-expression
    double-cast PPMI values; each iteration is matvec → normalize →
    6-dp floor-stable round, so iterates evolve as identical doubles
    (the sgns/logreg grid argument absorbs ln-ulp and sum-order
    noise); λ = e6-floored Rayleigh numerator over the final unit
    iterate, and deflation subtracts (λ_e6/1e6)·v₁v₁ᵀ — exact same
    double both engines.  Spark replays the collected ≤V² matrix in
    driver floats (the textrank precedent), DuckDB unrolls
    per-iteration CTEs.

    Scale shape: corpus-scale work is the ONE cooc pair agg; the
    O(V²·iters) factorization never touches the corpus."""
    import math

    cab = {
        (r["a"], r["b"]): r["c_ab"]
        for r in _cooc_cab(spark, sf_dir).collect()
    }
    marg: dict[str, int] = {}
    n_tot = 0
    for (a, b), c in cab.items():
        marg[a] = marg.get(a, 0) + c
        marg[b] = marg.get(b, 0) + c  # (a,a) deliberately counts twice
        n_tot += 2 * c if a == b else c
    # the cooc_ppmi marginal convention: endpoint counts from the pair
    # table with (a,a) twice; N = total endpoint mass / ... use the
    # same N as cooc_ppmi: sum over pairs of c (unordered), diagonal
    # counted once — mirror _cooc_ppmi's definition below in SQL.
    n_pairs = sum(cab.values())
    nodes = sorted(marg)
    rank = {t: i + 1 for i, t in enumerate(nodes)}

    def ppmi(a: str, b: str) -> float:
        c = cab.get((min(a, b), max(a, b)), 0)
        if c == 0:
            return 0.0
        v = math.log(
            (float(c) * n_pairs) / (float(marg[a]) * marg[b])
        )
        return v if v > 0.0 else 0.0

    edges: dict[str, list[tuple[str, float]]] = {t: [] for t in nodes}
    for (a, b), c in cab.items():
        v = ppmi(a, b)
        if v > 0.0:
            edges[a].append((b, v))
            if a != b:
                edges[b].append((a, v))

    def kn(x: int) -> int:
        return ((x % 1000000007) * 2654435761) % 1000000007

    def stable6(x: float) -> float:
        return math.floor(x * 1000000 + 0.5) / 1000000

    def power(defl: tuple[float, dict[str, float]] | None):
        v_init = {
            t: (kn(rank[t]) % 2001 - 1000) / 1000000.0 for t in nodes
        }
        v = dict(v_init)
        for _ in range(PSVD_ITERS):
            w = {t: 0.0 for t in nodes}
            for a in nodes:
                va = v[a]
                for b, m in edges[a]:
                    w[b] += m * va
            if defl is not None:
                lam, v1 = defl
                dot = 0.0
                for t in nodes:
                    dot += v1[t] * v[t]
                for t in nodes:
                    w[t] -= lam * v1[t] * dot
            nrm = math.sqrt(sum(x * x for x in w.values()))
            if nrm > 0.0:
                v = {t: stable6(w[t] / nrm) for t in nodes}
            else:  # mirror the SQL CASE: fall back to the init vector
                v = dict(v_init)
        # Rayleigh numerator vᵀMv (or deflated M) with the final v
        num = 0.0
        for a in nodes:
            va = v[a]
            for b, m in edges[a]:
                num += va * m * v[b]
        if defl is not None:
            lam, v1 = defl
            dot = 0.0
            for t in nodes:
                dot += v1[t] * v[t]
            num -= lam * dot * dot
        return v, math.floor(num * 1000000 + 0.5)

    v1, lam1_e6 = power(None)
    v2, lam2_e6 = power((lam1_e6 / 1000000.0, v1))
    rows = []
    for t in nodes:
        rows.append(
            (rank[t], t, 1, math.floor(v1[t] * 1000000 + 0.5), lam1_e6)
        )
        rows.append(
            (rank[t], t, 2, math.floor(v2[t] * 1000000 + 0.5), lam2_e6)
        )
    return spark.createDataFrame(
        rows,
        "rank long, token string, comp long, val_e6 long, lambda_e6 long",
    )


def _ppmi_svd_sql(
    w: int | None = None,
    vocab_k: int | None = None,
    iters: int = PSVD_ITERS,
) -> str:
    """ppmi_svd oracle: the cooc CTE chain to cab, symmetric PPMI
    edges (positive entries only), knuth init, unrolled
    matvec→normalize→round iterations for v1, then the deflated pass
    for v2 with the exact λ₁_e6/1e6 outer-product subtraction."""
    w = COOC_W if w is None else w
    vocab_k = COOC_VOCAB_K if vocab_k is None else vocab_k
    offsets = " UNION ALL ".join(
        f"SELECT doc_id, t, {d} AS d FROM toks" for d in range(1, w + 1)
    )

    def chain(prefix: str, defl: bool) -> str:
        its = []
        for k in range(1, iters + 1):
            mv = f"""{prefix}w{k} AS MATERIALIZED (
  SELECT n.tok, n.rank, coalesce(s.v, 0.0) AS wv
  FROM nodes n LEFT JOIN (
    SELECT e.b AS tok, sum(e.m * p.val) AS v
    FROM edges e JOIN {prefix}v{k - 1} p ON e.a = p.tok GROUP BY 1
  ) s ON n.tok = s.tok
)"""
            if defl:
                mv += f""", {prefix}d{k} AS MATERIALIZED (
  SELECT (SELECT sum(v1.val * p.val)
          FROM fin1 v1 JOIN {prefix}v{k - 1} p USING (tok)) AS dot
), {prefix}wd{k} AS MATERIALIZED (
  SELECT w.tok, w.rank,
         w.wv - (SELECT lam FROM lam1d) * v1.val
              * (SELECT dot FROM {prefix}d{k}) AS wv
  FROM {prefix}w{k} w JOIN fin1 v1 USING (tok)
)"""
                src = f"{prefix}wd{k}"
            else:
                src = f"{prefix}w{k}"
            its.append(
                mv
                + f""", {prefix}n{k} AS MATERIALIZED (
  SELECT sqrt(sum(wv * wv)) AS nrm FROM {src}
), {prefix}v{k} AS MATERIALIZED (
  SELECT tok, rank,
         CASE WHEN (SELECT nrm FROM {prefix}n{k}) > 0.0
              THEN floor(wv / (SELECT nrm FROM {prefix}n{k})
                         * 1000000 + 0.5) / 1000000
              ELSE val0 END AS val
  FROM {src} JOIN init USING (tok, rank)
)"""
            )
        return ",\n".join(its)

    ray1 = """ray1 AS MATERIALIZED (
  SELECT CAST(floor((
    SELECT sum(va.val * e.m * vb.val)
    FROM edges e JOIN fin1 va ON e.a = va.tok
                 JOIN fin1 vb ON e.b = vb.tok
  ) * 1000000 + 0.5) AS BIGINT) AS lam_e6
), lam1d AS MATERIALIZED (
  SELECT CAST(lam_e6 AS DOUBLE) / 1000000.0 AS lam FROM ray1
)"""
    ray2 = """ray2 AS (
  SELECT CAST(floor(((
    SELECT sum(va.val * e.m * vb.val)
    FROM edges e JOIN fin2 va ON e.a = va.tok
                 JOIN fin2 vb ON e.b = vb.tok
  ) - (SELECT lam FROM lam1d)
    * (SELECT sum(v1.val * v2.val) FROM fin1 v1 JOIN fin2 v2 USING (tok))
    * (SELECT sum(v1.val * v2.val) FROM fin1 v1 JOIN fin2 v2 USING (tok))
  ) * 1000000 + 0.5) AS BIGINT) AS lam_e6
)"""
    return f"""
WITH toks AS MATERIALIZED (
  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '[ \\t\\n\\x0B\\f\\r]+') AS t
  FROM documents WHERE trim(text) <> ''
), vocab AS MATERIALIZED (
  SELECT tok FROM (
    SELECT unnest(t) AS tok FROM toks
  ) GROUP BY 1 ORDER BY count(*) DESC, tok LIMIT {vocab_k}
), offs AS ({offsets}
), pe AS (
  SELECT least(p.x, p.y) AS a, greatest(p.x, p.y) AS b
  FROM (
    SELECT unnest(list_transform(generate_series(1, len(t) - d),
                                 i -> {{'x': t[i], 'y': t[i+d]}})) AS p
    FROM offs WHERE len(t) > d
  )
  WHERE p.x IN (SELECT tok FROM vocab) AND p.y IN (SELECT tok FROM vocab)
), cab AS MATERIALIZED (
  SELECT a, b, CAST(count(*) AS BIGINT) AS c_ab FROM pe GROUP BY 1, 2
), marg AS MATERIALIZED (
  SELECT tok, CAST(sum(c) AS BIGINT) AS m FROM (
    SELECT a AS tok, c_ab AS c FROM cab
    UNION ALL
    SELECT b AS tok, c_ab AS c FROM cab
  ) GROUP BY 1
), nt AS (
  SELECT CAST(sum(c_ab) AS BIGINT) AS n_pairs FROM cab
), nodes AS MATERIALIZED (
  SELECT tok, CAST(row_number() OVER (ORDER BY tok) AS BIGINT) AS rank
  FROM marg
), pm AS (
  SELECT c.a, c.b,
         ln((CAST(c.c_ab AS DOUBLE) * nt.n_pairs)
            / (CAST(ma.m AS DOUBLE) * mb.m)) AS v
  FROM cab c JOIN marg ma ON c.a = ma.tok
             JOIN marg mb ON c.b = mb.tok
             CROSS JOIN nt
), edges AS MATERIALIZED (
  SELECT a, b, v AS m FROM pm WHERE v > 0.0
  UNION ALL
  SELECT b AS a, a AS b, v AS m FROM pm WHERE v > 0.0 AND a <> b
), init AS MATERIALIZED (
  SELECT tok, rank,
         CAST(((((rank) % 1000000007) * 2654435761) % 1000000007)
              % 2001 - 1000 AS DOUBLE) / 1000000.0 AS val0
  FROM nodes
), p1v0 AS (
  SELECT tok, rank, val0 AS val FROM init
),
{chain("p1", False)},
fin1 AS MATERIALIZED (SELECT tok, rank, val FROM p1v{iters}),
{ray1},
p2v0 AS (
  SELECT tok, rank, val0 AS val FROM init
),
{chain("p2", True)},
fin2 AS MATERIALIZED (SELECT tok, rank, val FROM p2v{iters}),
{ray2}
SELECT n.rank, n.tok AS token, CAST(1 AS BIGINT) AS comp,
       CAST(floor(f.val * 1000000 + 0.5) AS BIGINT) AS val_e6,
       r.lam_e6 AS lambda_e6
FROM nodes n JOIN fin1 f USING (tok) CROSS JOIN ray1 r
UNION ALL
SELECT n.rank, n.tok AS token, CAST(2 AS BIGINT) AS comp,
       CAST(floor(f.val * 1000000 + 0.5) AS BIGINT) AS val_e6,
       r.lam_e6 AS lambda_e6
FROM nodes n JOIN fin2 f USING (tok) CROSS JOIN ray2 r
"""


# Snippet-extraction spec — MIRRORED in `_best_snippet_sql`; change
# together.  Luhn-style significant-token density over fixed SNIP_W
# windows (the corpus has no sentence terminators, so windows ARE the
# passages — the search-result snippet shape that pairs with
# bm25_topk): significant set = Luhn's MID-FREQUENCY band — vocab
# ranks (SNIP_RANK_CUT, COOC_VOCAB_K] by (cnt DESC, tok) minus
# functions.text.STOPWORDS (cutting the top ranks is what makes the
# density discriminative: with the full vocab nearly every window
# saturates — measured); argmax = array_position of the
# array_max (FIRST max ⇒ the (nsig DESC, pos ASC) tie-break without
# any explode); width = least(SNIP_W, n) so short docs form one
# clamped window on both engines.
SNIP_W = 10
SNIP_RANK_CUT = 10


def q_best_snippet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Best-snippet extraction (Luhn 1958's significant-word density,
    the passage form) — per document, the ``SNIP_W``-token window with
    the most significant tokens: the snippet a search stack shows
    under a `bm25_topk` hit, and the first member of the
    summarization family (RAKE/TextRank rank words; this extracts the
    best PASSAGE).  Emits per doc the window position, its
    significant count, the Luhn density score (nsig²·1000) DIV width,
    and the md5 of the space-joined snippet tokens (byte-checkable
    without shipping text).

    Cross-engine: the window sums, argmax and snippet slice are PURE
    ARRAY OPS — Spark slice/aggregate/array_max/array_position ↔
    DuckDB 1-based inclusive t[i:i+W−1] slices with
    list_sum/list_max/list_position; array_position returns the FIRST
    max on both engines, which IS the (nsig DESC, pos ASC) rule; the
    md5 of array_to_string(' ') matches concat_ws.

    Scale shape: ZERO exchanges — one pure Catalyst map per doc, no
    explode, no window function, no join (the repetition-filter plan
    class); per-doc work is O(n·SNIP_W) JVM array ops.  The
    significant set is one bounded vocab agg shipped as literals."""
    from rxtls_spark.functions.text import STOPWORDS

    docs = (
        _docs(spark, sf_dir)
        .select("doc_id", "text")
        .where(F.trim("text") != "")
    )
    toks = _lm_tokens()
    vocab_rows = (
        docs.select(F.explode(toks).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), "tok")
        .limit(COOC_VOCAB_K)
        .collect()
    )
    ranked = sorted(
        ((r["tok"], r["cnt"]) for r in vocab_rows),
        key=lambda kv: (-kv[1], kv[0]),
    )
    sig_set = sorted(
        t
        for k, (t, _c) in enumerate(ranked)
        if k >= SNIP_RANK_CUT and t not in STOPWORDS
    )
    sig_arr = F.array(*[F.lit(w) for w in sig_set])
    sig = F.transform(
        toks, lambda t: F.array_contains(sig_arr, t).cast("long")
    )
    n = F.size(toks)
    npos = F.greatest(n - F.lit(SNIP_W - 1), F.lit(1))
    nsigs = F.transform(
        F.sequence(F.lit(1), npos),
        lambda i: F.aggregate(
            F.slice(sig, i, SNIP_W), F.lit(0).cast("long"), lambda a, x: a + x
        ),
    )
    best_nsig = F.array_max(nsigs)
    best_pos = F.array_position(nsigs, best_nsig)
    width = F.least(F.lit(SNIP_W), n)
    return docs.select(
        "doc_id",
        n.cast("long").alias("n_tokens"),
        npos.cast("long").alias("n_windows"),
        best_pos.cast("long").alias("best_pos"),
        best_nsig.cast("long").alias("best_nsig"),
        (best_nsig * best_nsig * F.lit(1000)).cast("long").alias("_num"),
        F.md5(
            F.concat_ws(" ", F.slice(toks, best_pos.cast("int"), SNIP_W))
        ).alias("snippet_md5"),
    ).select(
        "doc_id",
        "n_tokens",
        "n_windows",
        "best_pos",
        "best_nsig",
        F.expr(f"_num DIV least({SNIP_W}, n_tokens)").alias("score_e3"),
        "snippet_md5",
    )


def _best_snippet_sql(
    w: int = SNIP_W,
    vocab_k: int = COOC_VOCAB_K,
    cut: int = SNIP_RANK_CUT,
) -> str:
    """best_snippet oracle: the shared vocab CTE minus the RAKE
    stoplist, 1-based inclusive window slices, list_sum/list_max/
    list_position (first max == the tie-break), md5 of the joined
    snippet."""
    from rxtls_spark.functions.text import STOPWORDS

    stoplist = ", ".join(f"'{x}'" for x in STOPWORDS)
    return f"""
WITH toks AS MATERIALIZED (
  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '[ \\t\\n\\x0B\\f\\r]+') AS t
  FROM documents WHERE trim(text) <> ''
), vocab AS (
  SELECT tok FROM (
    SELECT tok, row_number() OVER (ORDER BY count(*) DESC, tok) AS rk
    FROM (SELECT unnest(t) AS tok FROM toks) GROUP BY tok
  ) WHERE rk > {cut} AND rk <= {vocab_k} AND tok NOT IN ({stoplist})
), sigl AS (
  SELECT list(tok ORDER BY tok) AS sl FROM vocab
), per AS (
  SELECT doc_id, t,
         list_transform(t, x -> CAST(list_contains(s.sl, x) AS BIGINT))
           AS sig,
         len(t) AS n,
         greatest(len(t) - {w - 1}, 1) AS npos
  FROM toks, sigl s
), wins AS (
  SELECT doc_id, t, n, npos,
         list_transform(generate_series(1, npos),
                        i -> CAST(list_sum(sig[i:i+{w - 1}]) AS BIGINT))
           AS nsigs
  FROM per
)
SELECT doc_id,
       CAST(n AS BIGINT) AS n_tokens,
       CAST(npos AS BIGINT) AS n_windows,
       CAST(list_position(nsigs, list_max(nsigs)) AS BIGINT) AS best_pos,
       CAST(list_max(nsigs) AS BIGINT) AS best_nsig,
       CAST((list_max(nsigs) * list_max(nsigs) * 1000)
            // least({w}, n) AS BIGINT) AS score_e3,
       md5(array_to_string(
         t[list_position(nsigs, list_max(nsigs)):
           list_position(nsigs, list_max(nsigs)) + {w - 1}], ' '))
         AS snippet_md5
FROM wins
"""


# TextTiling spec — MIRRORED in `_texttiling_sql`; change together.
# TT_W-token non-overlapping blocks ARE the pseudo-sentences (the
# best_snippet fixed-window convention — the corpus has no sentence
# terminators); depth uses the PREFIX/SUFFIX-max envelope, a
# deterministic simplification of Hearst's hill-climbing peaks
# (identical when sims are unimodal around the gap, and expressible
# as pure array ops on both engines).  TT_DEPTH_CUT = 40000 sits at
# ~p85 of the smoke-corpus depth distribution (measured) so both
# boundary and non-boundary paths exercise at every SF.
TT_W = 12
TT_DEPTH_CUT = 40000


def q_texttiling_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TextTiling topic segmentation (Hearst 1997, CL 23(1)) — per
    document: cosine cohesion between each adjacent pair of
    ``TT_W``-token blocks, depth scores against the prefix/suffix
    peak envelope, and topic boundaries where depth exceeds
    ``TT_DEPTH_CUT``.  The document-STRUCTURE member of the text
    family (best_snippet extracts a passage, doc_chunks splits
    blindly every K tokens — this finds WHERE the topic shifts, the
    split points a context-window packer or RAG chunker should
    prefer).  Emits per doc the block/gap/boundary counts, the
    deepest gap (first-max rule), and the md5 of the boundary index
    list (byte-checkable without shipping positions).

    Cross-engine: block dot products and norms are exact BIGINTs via
    nested array folds (Σ_x∈a cnt_b(x) ≡ Σ_t cnt_a·cnt_b); sim_e5 =
    floor(dot/sqrt(na·nb)·1e5) is IEEE ÷/sqrt on exact doubles — the
    bit-exact class (sqrt of a perfect square is exact, so identical
    blocks floor to exactly 100000 on both engines); depths are
    BIGINT arithmetic on the e5 sims; Spark slice ↔ DuckDB 1-based
    inclusive t[i:j] clamp short tails identically; the empty-array
    guards dodge BOTH engine traps (Spark sequence(1,0) is
    DESCENDING; DuckDB array_to_string([]) is NULL — the mlm
    coalesce gotcha).

    Scale shape: ZERO exchanges — one pure Catalyst map per doc (the
    best_snippet/repetition plan class); per-doc work is
    O(n·TT_W + g²) JVM array ops, no explode, no join, no UDF."""
    w = TT_W
    base = (
        _docs(spark, sf_dir)
        .select("doc_id", "text")
        .where(F.trim("text") != "")
        .select("doc_id", _lm_tokens().alias("t"))
        .withColumn("n", F.size("t"))
        .withColumn("g", F.expr(f"CAST((n + {w - 1}) DIV {w} AS INT) - 1"))
    )
    sims = F.expr(
        f"""CASE WHEN g >= 1 THEN transform(sequence(1, g), i ->
  CAST(floor(CAST(aggregate(slice(t, (i-1)*{w}+1, {w}), 0L,
        (acc, x) -> acc + size(filter(slice(t, i*{w}+1, {w}), y -> y = x))) AS DOUBLE)
   / sqrt(CAST(aggregate(slice(t, (i-1)*{w}+1, {w}), 0L,
        (acc2, x2) -> acc2 + size(filter(slice(t, (i-1)*{w}+1, {w}), y2 -> y2 = x2))) AS DOUBLE)
        * aggregate(slice(t, i*{w}+1, {w}), 0L,
        (acc3, x3) -> acc3 + size(filter(slice(t, i*{w}+1, {w}), y3 -> y3 = x3))))
   * 100000.0) AS BIGINT))
ELSE CAST(array() AS array<bigint>) END"""
    )
    depths = F.expr(
        "CASE WHEN size(sims) >= 1 THEN"
        " transform(sequence(1, size(sims)), i ->"
        " (array_max(slice(sims, 1, i)) - element_at(sims, i))"
        " + (array_max(slice(sims, i, size(sims) - i + 1))"
        " - element_at(sims, i)))"
        " ELSE CAST(array() AS array<bigint>) END"
    )
    bounds = F.expr(
        "CASE WHEN size(depths) >= 1 THEN"
        f" filter(sequence(1, size(depths)),"
        f" i -> element_at(depths, i) > {TT_DEPTH_CUT})"
        " ELSE CAST(array() AS array<int>) END"
    )
    return (
        base.withColumn("sims", sims)
        .withColumn("depths", depths)
        .withColumn("bounds", bounds)
        .select(
            "doc_id",
            F.col("n").cast("long").alias("n_tokens"),
            F.expr("CAST(g + 1 AS BIGINT)").alias("n_blocks"),
            F.expr("CAST(size(depths) AS BIGINT)").alias("n_gaps"),
            F.expr("CAST(size(bounds) AS BIGINT)").alias("n_bounds"),
            F.expr(
                "CAST(CASE WHEN size(depths) >= 1 THEN array_max(depths)"
                " ELSE 0 END AS BIGINT)"
            ).alias("max_depth_e5"),
            F.expr(
                "CAST(CASE WHEN size(depths) >= 1 THEN"
                " array_position(depths, array_max(depths))"
                " ELSE 0 END AS BIGINT)"
            ).alias("best_gap"),
            F.md5(
                F.expr(
                    "concat_ws(',', transform(bounds,"
                    " b -> CAST(b AS STRING)))"
                )
            ).alias("bounds_md5"),
        )
    )


def _texttiling_sql(w: int = TT_W, cut: int = TT_DEPTH_CUT) -> str:
    """texttiling oracle: identical block folds over 1-based
    inclusive slices, the same e5 cosine floor, prefix/suffix-max
    depths, and the coalesce('') md5 of the boundary list."""
    return f"""
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '[ \\t\\n\\x0B\\f\\r]+') AS t
  FROM documents WHERE trim(text) <> ''
), base AS (
  SELECT doc_id, t, len(t) AS n, (len(t) + {w - 1}) // {w} - 1 AS g
  FROM toks
), s AS (
  SELECT doc_id, n, g,
    CASE WHEN g >= 1 THEN list_transform(generate_series(1, g), i ->
      CAST(floor(CAST(list_sum(list_transform(t[(i-1)*{w}+1 : i*{w}], x ->
             len(list_filter(t[i*{w}+1 : (i+1)*{w}], y -> y = x)))) AS DOUBLE)
       / sqrt(CAST(list_sum(list_transform(t[(i-1)*{w}+1 : i*{w}], x2 ->
             len(list_filter(t[(i-1)*{w}+1 : i*{w}], y2 -> y2 = x2)))) AS DOUBLE)
            * list_sum(list_transform(t[i*{w}+1 : (i+1)*{w}], x3 ->
             len(list_filter(t[i*{w}+1 : (i+1)*{w}], y3 -> y3 = x3)))))
       * 100000.0) AS BIGINT))
    ELSE CAST([] AS BIGINT[]) END AS sims
  FROM base
), dep AS (
  SELECT doc_id, n, g, sims,
    CASE WHEN len(sims) >= 1 THEN
      list_transform(generate_series(1, len(sims)), i ->
        (list_max(sims[1:i]) - sims[i])
        + (list_max(sims[i:len(sims)]) - sims[i]))
    ELSE CAST([] AS BIGINT[]) END AS depths
  FROM s
)
SELECT doc_id,
       CAST(n AS BIGINT) AS n_tokens,
       CAST(g + 1 AS BIGINT) AS n_blocks,
       CAST(len(depths) AS BIGINT) AS n_gaps,
       CAST(len(list_filter(generate_series(1, len(depths)),
                            i -> depths[i] > {cut})) AS BIGINT) AS n_bounds,
       CAST(CASE WHEN len(depths) >= 1 THEN list_max(depths)
                 ELSE 0 END AS BIGINT) AS max_depth_e5,
       CAST(CASE WHEN len(depths) >= 1 THEN
              list_position(depths, list_max(depths))
            ELSE 0 END AS BIGINT) AS best_gap,
       md5(coalesce(array_to_string(
         list_filter(generate_series(1, len(depths)), i -> depths[i] > {cut}),
         ','), '')) AS bounds_md5
FROM dep
"""


# Bradley-Terry spec — MIRRORED in `_bradley_terry_sql`; change
# together.  Duels: each doc challenges the knuth forward-jump
# partner (the nsp_pairs co-partitioned equi-join shape, salt 5 so it
# never collides with NSP's jump); cross-source, distinct-quality
# duels only; winner = higher e5 quality numerator.  Counts are
# e6-share-scaled BEFORE the MM iterations so every later magnitude
# is bounded regardless of corpus size; per iteration the raw
# strength is clamped to [1, 9e18 DIV (n·1e6)] so the normalization
# product pr·n·1e6 provably fits BIGINT; init p = 1e6, mean kept at
# 1e6 by the truncating-DIV normalization.
BT_JUMP_MOD = 37
BT_SALT = 5
BT_ITERS = 8


def _bt_iterate(
    srcs: list[str],
    wmat: dict[tuple[str, str], int],
) -> dict[str, int]:
    """The exact-integer Bradley-Terry MM loop (Zermelo 1929; Hunter
    2004's minorization-maximization) over the bounded win matrix —
    plain Python ints, the SAME truncating-DIV arithmetic the oracle
    unrolls (positive operands, so // == both engines' DIV)."""
    n = len(srcs)
    total = sum(wmat.values())
    m = {k: (w * 10**6) // total for k, w in wmat.items()}
    wins = {s: sum(m.get((s, b), 0) for b in srcs) for s in srcs}
    games = {
        (a, b): m.get((a, b), 0) + m.get((b, a), 0)
        for a in srcs
        for b in srcs
        if a != b
    }
    cl = 9 * 10**18 // (n * 10**6)
    p = {s: 10**6 for s in srcs}
    for _ in range(BT_ITERS):
        t = {
            s: sum(
                (g * 10**9) // (p[s] + p[b])
                for (a, b), g in games.items()
                if a == s and g > 0
            )
            for s in srcs
        }
        pr = {
            s: (
                1
                if t[s] <= 0
                else min(cl, max(1, (wins[s] * 10**9) // t[s]))
            )
            for s in srcs
        }
        tot_pr = sum(pr.values())
        p = {s: (pr[s] * n * 10**6) // tot_pr for s in srcs}
    return p


def q_bradley_terry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bradley-Terry source-strength ranking from pairwise quality
    duels — the aggregation RLHF pipelines run over preference pairs
    (BT is the likelihood the reward model fits; here it ranks
    SOURCES so the mixture weighting can prefer consistently-winning
    ones, a cardinal strength `source_funnel`'s marginal rates can't
    give): deterministic knuth-jump duels between docs of different
    sources, winner = higher stable quality numerator, then the
    exact-integer MM fixed-point on the (source × source) win matrix.
    Emits per source the raw win/game counts, the converged strength
    p_e6 (mean 1e6), and the rank.

    Cross-engine: duel construction and the win matrix are pure
    BIGINT formulas; the MM loop runs on the COLLECTED matrix
    (metadata-scale — |sources|² cells) in exact Python ints on the
    Spark side and as BT_ITERS unrolled MATERIALIZED CTE rounds in
    DuckDB — identical truncating-DIV arithmetic, bit-equal by
    construction (the quantile_normalize driver-literal precedent).

    Scale shape: ONE co-partitioned self equi-join on the computed
    partner key (the nsp_pairs plan — no broadcast of the corpus),
    ONE hash agg onto ≤|sources|² cells; everything after is
    metadata-scale driver math."""
    qnum = F.floor(quality_score() * F.lit(100000.0) + F.lit(0.5)).cast(
        "long"
    )
    docs = _docs(spark, sf_dir).select(
        "doc_id", "source", qnum.alias("q_e5")
    )
    left = docs.select(
        F.col("source").alias("sa"),
        F.col("q_e5").alias("qa"),
        (
            F.col("doc_id")
            + 1
            + knuth_hash(F.col("doc_id") * BT_SALT) % BT_JUMP_MOD
        ).alias("partner_id"),
    )
    right = docs.select(
        F.col("doc_id").alias("partner_id"),
        F.col("source").alias("sb"),
        F.col("q_e5").alias("qb"),
    )
    duels = (
        left.join(right, "partner_id")
        .where((F.col("sa") != F.col("sb")) & (F.col("qa") != F.col("qb")))
        .select(
            F.when(F.col("qa") > F.col("qb"), F.col("sa"))
            .otherwise(F.col("sb"))
            .alias("win_src"),
            F.when(F.col("qa") > F.col("qb"), F.col("sb"))
            .otherwise(F.col("sa"))
            .alias("lose_src"),
        )
    )
    cells = duels.groupBy("win_src", "lose_src").count().collect()
    wmat = {(r["win_src"], r["lose_src"]): r["count"] for r in cells}
    srcs = sorted({a for a, _ in wmat} | {b for _, b in wmat})
    p = _bt_iterate(srcs, wmat)
    wins_raw = {s: sum(w for (a, _), w in wmat.items() if a == s) for s in srcs}
    games_raw = {
        s: wins_raw[s] + sum(w for (_, b), w in wmat.items() if b == s)
        for s in srcs
    }
    ranked = sorted(srcs, key=lambda s: (-p[s], s))
    rows = [
        (s, wins_raw[s], games_raw[s], p[s], i + 1)
        for i, s in enumerate(ranked)
    ]
    return spark.createDataFrame(
        rows, "source string, n_wins long, n_games long, p_e6 long, rank long"
    )


def _bradley_terry_sql() -> str:
    """bradley_terry oracle: identical duel construction and win
    matrix, then BT_ITERS unrolled MM rounds as MATERIALIZED CTEs
    (the BPE chained-CTE lesson — DuckDB would otherwise re-inline
    the chain exponentially)."""
    its = []
    for k in range(1, BT_ITERS + 1):
        its.append(f"""t{k} AS MATERIALIZED (
  SELECT g.a AS src,
         CAST(sum((g.g * 1000000000) // (pa.p + pb.p)) AS BIGINT) AS t
  FROM games g
  JOIN p{k-1} pa ON g.a = pa.src
  JOIN p{k-1} pb ON g.b = pb.src
  GROUP BY 1
), r{k} AS MATERIALIZED (
  SELECT s.src,
         CASE WHEN t.t IS NULL OR t.t <= 0 THEN CAST(1 AS BIGINT)
              ELSE least((SELECT cl FROM ns),
                         greatest(1, (w.w * 1000000000) // t.t)) END AS pr
  FROM srcs s
  LEFT JOIN t{k} t ON s.src = t.src
  JOIN wins w ON s.src = w.src
), p{k} AS MATERIALIZED (
  SELECT src,
         CAST((pr * (SELECT n FROM ns) * 1000000)
              // (SELECT CAST(sum(pr) AS BIGINT) FROM r{k}) AS BIGINT) AS p
  FROM r{k}
)""")
    chain = ",\n".join(its)
    return f"""
{_TEXT_CTE}
, qq AS (
  SELECT doc_id,
         CAST(floor(({_QUALITY_SQL}) * 100000 + 0.5) AS BIGINT) AS q_e5
  FROM feats
), dd AS (
  SELECT q.doc_id, d.source, q.q_e5
  FROM qq q JOIN (SELECT doc_id, source FROM documents) d USING (doc_id)
), duels AS (
  SELECT CASE WHEN a.q_e5 > b.q_e5 THEN a.source ELSE b.source END AS win_src,
         CASE WHEN a.q_e5 > b.q_e5 THEN b.source ELSE a.source END AS lose_src
  FROM dd a
  JOIN dd b ON b.doc_id = a.doc_id + 1
     + (((((a.doc_id * {BT_SALT}) % {KNUTH_P}) * {KNUTH_A}) % {KNUTH_P})
        % {BT_JUMP_MOD})
  WHERE a.source <> b.source AND a.q_e5 <> b.q_e5
), wmat AS MATERIALIZED (
  SELECT win_src AS a, lose_src AS b, CAST(count(*) AS BIGINT) AS w
  FROM duels GROUP BY 1, 2
), srcs AS MATERIALIZED (
  SELECT DISTINCT src FROM (
    SELECT a AS src FROM wmat UNION ALL SELECT b AS src FROM wmat
  )
), ns AS MATERIALIZED (
  SELECT CAST(count(*) AS BIGINT) AS n,
         9000000000000000000 // (CAST(count(*) AS BIGINT) * 1000000) AS cl
  FROM srcs
), wmat_s AS MATERIALIZED (
  SELECT a, b,
         (w * 1000000) // (SELECT CAST(sum(w) AS BIGINT) FROM wmat) AS w
  FROM wmat
), wins AS MATERIALIZED (
  SELECT s.src, CAST(coalesce(sum(m.w), 0) AS BIGINT) AS w
  FROM srcs s LEFT JOIN wmat_s m ON s.src = m.a GROUP BY 1
), games AS MATERIALIZED (
  SELECT a, b, CAST(sum(n) AS BIGINT) AS g FROM (
    SELECT a, b, w AS n FROM wmat_s
    UNION ALL
    SELECT b AS a, a AS b, w AS n FROM wmat_s
  ) GROUP BY 1, 2
), wins_raw AS (
  SELECT s.src, CAST(coalesce(sum(m.w), 0) AS BIGINT) AS n_wins
  FROM srcs s LEFT JOIN wmat m ON s.src = m.a GROUP BY 1
), losses_raw AS (
  SELECT s.src, CAST(coalesce(sum(m.w), 0) AS BIGINT) AS n_losses
  FROM srcs s LEFT JOIN wmat m ON s.src = m.b GROUP BY 1
), p0 AS (
  SELECT src, CAST(1000000 AS BIGINT) AS p FROM srcs
),
{chain}
SELECT w.src AS source, w.n_wins, w.n_wins + l.n_losses AS n_games,
       p.p AS p_e6,
       CAST(row_number() OVER (ORDER BY p.p DESC, w.src) AS BIGINT) AS rank
FROM wins_raw w
JOIN losses_raw l ON w.src = l.src
JOIN p{BT_ITERS} p ON w.src = p.src
"""


QUERIES_TRAIN: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "doc_rarity": q_doc_rarity,
    "weighted_sample": q_weighted_sample,
    "secret_scan": q_secret_scan,
    "bradley_terry": q_bradley_terry,
    "isotonic_fit": q_isotonic_fit,
    "dbscan_clusters": q_dbscan_clusters,
    "cooc_ppmi": q_cooc_ppmi,
    "platt_scaling": q_platt_scaling,
    "kn_bigram_score": q_kn_bigram_score,
    "minhash_calibration": q_minhash_calibration,
    "blocklist_filter": q_blocklist_filter,
    "char_entropy": q_char_entropy,
    "scorer_agreement": q_scorer_agreement,
    "rake_keywords": q_rake_keywords,
    "oov_curve": q_oov_curve,
    "hard_negatives": q_hard_negatives,
    "dataset_card": q_dataset_card,
    "knn_components": q_knn_components,
    "triangle_count": q_triangle_count,
    "source_kl": q_source_kl,
    "source_jsd": q_source_jsd,
    "source_geomedian": q_source_geomedian,
    "compression_ratio": q_compression_ratio,
    "source_minhash_jaccard": q_source_minhash_jaccard,
    "source_overlap": q_source_overlap,
    "cluster_canonical": q_cluster_canonical,
    "temperature_mix": q_temperature_mix,
    "zipf_alpha": q_zipf_alpha,
    "postings_size": q_postings_size,
    "soft_dedup": q_soft_dedup,
    "rho_loss_select": q_rho_loss_select,
    "source_centroid_sim": q_source_centroid_sim,
    "bitext_mine": q_bitext_mine,
    "text_features": q_text_features,
    "token_stats": q_token_stats,
    "lang_confusion": q_lang_confusion,
    "pii_scrub": q_pii_scrub,
    "k_anonymity": q_k_anonymity,
    "t_closeness": q_t_closeness,
    "contamination": q_contamination,
    "doc_chunks": q_doc_chunks,
    "repetition": q_repetition,
    "sequence_pack": q_sequence_pack,
    "packing_efficiency": q_packing_efficiency,
    "mixture_sample": q_mixture_sample,
    "corpus_sample": q_corpus_sample,
    "stratified_sample": q_stratified_sample,
    "quality_quantile_gate": q_quality_quantile_gate,
    "quality_quantile_gate_approx": q_quality_quantile_gate_approx,
    "source_ks_drift": q_source_ks_drift,
    "source_w1_drift": q_source_w1_drift,
    "source_diversity": q_source_diversity,
    "vocab_richness": q_vocab_richness,
    "winnow_fingerprints": q_winnow_fingerprints,
    "branching_entropy": q_branching_entropy,
    "embedding_anisotropy": q_embedding_anisotropy,
    "source_sliced_w1": q_source_sliced_w1,
    "dawid_skene": q_dawid_skene,
    "confident_learning": q_confident_learning,
    "textrank_keywords": q_textrank_keywords,
    "sgns_embeddings": q_sgns_embeddings,
    "ppmi_svd": q_ppmi_svd,
    "best_snippet": q_best_snippet,
    "texttiling_segments": q_texttiling_segments,
    "psi_drift": q_psi_drift,
    "quality_outliers": q_quality_outliers,
    "source_gini": q_source_gini,
    "script_profile": q_script_profile,
    "lm_score_broadcast": q_lm_score_broadcast,
    "dsir_weights": q_dsir_weights,
    "moore_lewis": q_moore_lewis,
    "dsir_topfrac": q_dsir_topfrac,
    "bm25_topk": q_bm25_topk,
    "qlm_topk": q_qlm_topk,
    "pl2_topk": q_pl2_topk,
    "borda_fusion": q_borda_fusion,
    "rrf_fusion": q_rrf_fusion,
    "tfidf_topterms": q_tfidf_topterms,
    "bigram_lm_score": q_bigram_lm_score,
    "stupid_backoff": q_stupid_backoff,
    "source_keyness": q_source_keyness,
    "readability": q_readability,
    "doremi_weights": q_doremi_weights,
    "filter_cascade": q_filter_cascade,
    "source_funnel": q_source_funnel,
    "ngram_novelty": q_ngram_novelty,
    "curriculum_order": q_curriculum_order,
    "corpus_diff": q_corpus_diff,
    "lm_score": q_lm_score,
    "ccnet_buckets": q_ccnet_buckets,
    "unicode_nfc": q_unicode_nfc,
    "inverted_index": q_inverted_index,
    "bloom_dedup": q_bloom_dedup,
    "url_canonicalize": q_url_canonicalize,
    "cdc_chunk_dedup": q_cdc_chunk_dedup,
    "dedup_exact": q_exact_dups,
    "dedup_normalized": q_normalized_dups,
    "dedup_minhash_lsh": q_minhash_near_dups,
    "dedup_simhash": q_simhash_near_dups,
    "dedup_clusters": q_dedup_clusters,
    "training_mix": q_training_mix,
    "doc_fingerprints": q_doc_fingerprints,
    "ngram_jaccard": q_ngram_jaccard,
    "dedup_embedding": q_embedding_dups,
    "dedup_embedding_lsh": q_embedding_dups_lsh,
    "semantic_dedup": q_semantic_dedup,
    "span_dedup": q_span_dedup,
    "exact_substr": q_exact_substr,
    "pagerank": q_pagerank,
    "hits": q_hits,
    "label_propagation": q_label_propagation,
    "graph_modularity": q_graph_modularity,
    "degree_assortativity": q_degree_assortativity,
    "link_predict": q_link_predict,
    "khop_reach": q_khop_reach,
    "kcore": q_kcore,
    "proto_prune": q_proto_prune,
    "d4_prune": q_d4_prune,
    "mmr_select": q_mmr_select,
    "cms_heavy_hitters": q_cms_heavy_hitters,
    "embedding_pca": q_embedding_pca,
    "shuffle_shards": q_shuffle_shards,
    "token_budget": q_token_budget,
    "unimax_sample": q_unimax_sample,
    "holdout_split": q_holdout_split,
    "lm_eval_holdout": q_lm_eval_holdout,
    "data_scaling_curve": q_data_scaling_curve,
    "logreg_quality": q_logreg_quality,
    "logreg_infer": q_logreg_infer,
    "el2n_prune": q_el2n_prune,
    "grand_prune": q_grand_prune,
    "calibration_bins": q_calibration_bins,
    "brier_decomp": q_brier_decomp,
    "conformal_coverage": q_conformal_coverage,
    "roc_auc": q_roc_auc,
    "pr_curve": q_pr_curve,
    "scorer_kappa": q_scorer_kappa,
    "scorer_kendall": q_scorer_kendall,
    "preference_pairs": q_preference_pairs,
    "grad_noise_scale": q_grad_noise_scale,
    "uncertainty_sample": q_uncertainty_sample,
    "cartography": q_cartography,
    "good_turing": q_good_turing,
    "collocations_g2": q_collocations_g2,
    "chi2_select": q_chi2_select,
    "source_burrows_delta": q_source_burrows_delta,
    "token_burstiness": q_token_burstiness,
    "lang_source_cramer": q_lang_source_cramer,
    "min_k_prob": q_min_k_prob,
    "silhouette": q_silhouette,
    "heaps_law": q_heaps_law,
    "gradient_align": q_gradient_align,
    "tracin_influence": q_tracin_influence,
    "fim_transform": q_fim_transform,
    "span_corrupt": q_span_corrupt,
    "mlm_transform": q_mlm_transform,
    "nsp_pairs": q_nsp_pairs,
    "random_projection": q_random_projection,
    "cka_alignment": q_cka_alignment,
    "hamming_codes": q_hamming_codes,
    "quantile_normalize": q_quantile_normalize,
    "best_of_n": q_best_of_n,
    "lsh_bucket_stats": q_lsh_bucket_stats,
    "blocking_quality": q_blocking_quality,
    "dp_noisy_counts": q_dp_noisy_counts,
    "poisson_bootstrap": q_poisson_bootstrap,
    "auc_bootstrap": q_auc_bootstrap,
    "boilerplate_lines": q_boilerplate_lines,
    "hll_distinct": q_hll_distinct,
    "hll_intersect": q_hll_intersect,
    "edit_verify": q_edit_verify,
    "bleu_pairs": q_bleu_pairs,
    "rouge_pairs": q_rouge_pairs,
    "split_leakage": q_split_leakage,
    "bpe_merges": q_bpe_merges,
    "bpe_encode": q_bpe_encode,
    "tokenizer_fertility": q_tokenizer_fertility,
    "ann_brute_force": q_ann_brute_force,
    "ann_recall_eval": q_ann_recall_eval,
    "ndcg_eval": q_ndcg_eval,
    "map_eval": q_map_eval,
    "rocchio_expand": q_rocchio_expand,
    "matryoshka_eval": q_matryoshka_eval,
    "quantized_recall": q_quantized_recall,
    "ann_lsh": q_ann_lsh,
    "ann_ivf": q_ann_ivf,
    "kmeans": q_kmeans,
    "kcenter_coreset": q_kcenter_coreset,
    "cluster_purity": q_cluster_purity,
    "knn_graph": q_knn_graph,
    "lof_outliers": q_lof_outliers,
    "set_simjoin": q_set_simjoin,
    "embedding_quantize": q_embedding_quantize,
    "ann_ivf_pq": q_ann_ivf_pq,
    "embedding_stats": q_embedding_stats,
    "media_counts": q_media_counts,
    "media_resize": q_media_resize,
    "media_frames": q_media_frames,
    "media_phash": q_media_phash,
    "media_audio_features": q_media_audio_features,
}


# --- oracle SQL ----------------------------------------------------------------


def _occ_sql(marker: str) -> str:
    m = marker.replace("'", "''")
    return (
        f"CAST((length(t) - length(replace(t, '{m}', ''))) / {len(marker)} AS BIGINT)"
    )


def _lang_sql() -> str:
    """score columns + argmax CASE, mirroring functions/text.py."""
    scores = []
    for lang, markers in LANG_MARKERS.items():
        expr = " + ".join(_occ_sql(m) for m in markers)
        scores.append(f"({expr}) AS s_{lang}")
    # RE2 (DuckDB) spells unicode ranges \x{4e00}, not Java's 一
    zh = "CAST(length(regexp_replace(text, '[^\\x{4e00}-\\x{9fff}]', '', 'g')) AS BIGINT) AS s_zh"
    scores.append(zh)
    return ", ".join(scores)


def _lang_guess_case() -> str:
    mx = "greatest(" + ", ".join(f"s_{lang}" for lang in LANG_PRIORITY) + ")"
    whens = " ".join(
        f"WHEN s_{lang} = {mx} THEN '{lang}'" for lang in LANG_PRIORITY
    )
    return f"CASE WHEN {mx} <= 0 THEN 'und' {whens} END"


def _scored_feats_ctes(src: str = "documents") -> str:
    """The scored/feats CTE bodies over an arbitrary source relation
    (must expose doc_id, lang, text) — shared by text_features and the
    training-mix oracle."""
    return f"""scored AS (
  SELECT doc_id, lang, text, ' ' || lower(text) || ' ' AS t,
         {_lang_sql()}
  FROM {src}
), feats AS (
  SELECT *,
    CAST(length(text) AS BIGINT) AS n_chars,
    CASE WHEN trim(text) = '' THEN 0
         ELSE CAST(len(regexp_split_to_array(trim(text), '[ \\t\\n\\x0B\\f\\r]+')) AS BIGINT)
    END AS n_tokens,
    length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
      / greatest(length(text), 1)::DOUBLE AS alpha_ratio,
    length(regexp_replace(text, '[^0-9]', '', 'g'))
      / greatest(length(text), 1)::DOUBLE AS digit_ratio,
    length(regexp_replace(text, '[^.,;:!?]', '', 'g'))
      / greatest(length(text), 1)::DOUBLE AS punct_ratio,
    {_lang_guess_case()} AS lang_guess
  FROM scored
)"""


_TEXT_CTE = f"""
WITH {_scored_feats_ctes()}
"""

_QUALITY_SQL = """floor(greatest(0.0, least(1.0,
    0.4 * alpha_ratio
    + 0.3 * least(n_chars / 500.0, 1.0)
    + 0.3 * (1.0 - least(1.0, 4.0 * punct_ratio + 4.0 * digit_ratio))))
    * 100000 + 0.5) / 100000"""

# The rarity + stable-qnum CTE chain shared by the
# `scorer_agreement` AND `scorer_kendall` oracles (edit once, both
# move): rdf/rn/rsc/rar is the doc_rarity e3 ln(N/df) form, qq the
# e5 quality numerator.
_RARITY_QNUM_CTES = f""", rtoks AS (
  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '[ \\t\\n\\x0B\\f\\r]+') AS t
  FROM documents WHERE trim(text) <> ''
), rinst AS (
  SELECT doc_id, unnest(t) AS tok FROM rtoks
), rdf AS (
  SELECT tok, CAST(count(DISTINCT doc_id) AS BIGINT) AS df FROM rinst GROUP BY 1
), rn AS (
  SELECT CAST(count(*) AS BIGINT) AS n FROM rtoks
), rsc AS (
  SELECT i.doc_id, CAST(count(*) AS BIGINT) AS n_toks,
         CAST(sum(CAST(floor(ln(rn.n / CAST(d.df AS DOUBLE)) * 1000.0) AS BIGINT)) AS BIGINT) AS s
  FROM rinst i JOIN rdf d USING (tok), rn GROUP BY 1
), rar AS (
  SELECT doc_id, CAST(s // n_toks AS BIGINT) AS rarity_e3 FROM rsc
), qq AS (
  SELECT doc_id, CAST(floor(({_QUALITY_SQL}) * 100000 + 0.5) AS BIGINT) AS qnum
  FROM feats
)"""


# The Gopher-repetition CTE bodies (w/base/g2m/g3d) — shared by the
# `repetition` and `filter_cascade` oracles.
_REP_CTES = """w AS (
  SELECT doc_id, greatest(len(text), 1) AS n_chars,
         CASE WHEN trim(text) = '' THEN []::VARCHAR[]
              ELSE regexp_split_to_array(trim(text), '[ \\t\\n\\x0B\\f\\r]+') END AS words
  FROM documents
), base AS (
  SELECT doc_id, n_chars, len(words) AS n_words,
         CASE WHEN len(words) > 0
              THEN 1.0 - len(list_distinct(words)) / CAST(len(words) AS DOUBLE)
              ELSE 0.0 END AS dup_word_frac,
         list_transform(generate_series(1, len(words) - 1),
                        i -> words[i] || ' ' || words[i+1]) AS g2,
         list_transform(generate_series(1, len(words) - 2),
                        i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2]) AS g3
  FROM w
), g2m AS (
  SELECT doc_id, max(chars) AS top_chars FROM (
    SELECT doc_id, gram, count(*) * length(gram) AS chars
    FROM (SELECT doc_id, unnest(g2) AS gram FROM base) GROUP BY 1, 2
  ) GROUP BY 1
), g3d AS (
  SELECT doc_id, sum(chars) AS dup_chars FROM (
    SELECT doc_id, gram, count(*) * length(gram) AS chars, count(*) AS cnt
    FROM (SELECT doc_id, unnest(g3) AS gram FROM base) GROUP BY 1, 2
  ) WHERE cnt >= 2 GROUP BY 1
)"""

_DUPS_CTE = """
WITH docs AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000000, text FROM documents WHERE doc_id % 20 = 0
  UNION ALL
  SELECT doc_id + 2000000000, text || ' extra!' FROM documents WHERE doc_id % 20 = 0
)
"""

_MEDIA_CTE = """
WITH media AS (
  SELECT doc_id,
    CASE (doc_id % 3) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
    16 + doc_id % 48 AS w, 16 + doc_id % 32 AS h, 1 + doc_id % 3 AS ch,
    2 + doc_id % 6 AS video_frames,
    -- images are real PNGs: decoded body = the full w*h*ch pixel array;
    -- audio is real 16-bit PCM WAV: decoded body = n_frames*ch*2;
    -- video is a real ANIMATED PNG: decoded body = frames*w*h*ch
    CASE WHEN doc_id % 3 = 0 THEN (16 + doc_id % 48) * (16 + doc_id % 32) * (1 + doc_id % 3)
         WHEN doc_id % 3 = 1 THEN (256 + doc_id % 1024) * (1 + doc_id % 3) * 2
         ELSE (2 + doc_id % 6) * (16 + doc_id % 48) * (16 + doc_id % 32) * (1 + doc_id % 3)
    END AS body_bytes,
    'real' AS decode_ok
  FROM documents
)
"""


def _bm25_sql() -> str:
    """Generated BM25 oracle — per-term score expressions expanded
    textually in FIXED term order (rk 1..N) so the three-term addition
    matches the Spark expression's order exactly; the per-(doc, rk)
    pivot uses sum(CASE ... ELSE 0) over exactly one non-zero row, so
    no FP reorder can occur.  Constants mirror BM25_K1/B/N_TERMS/TOPK."""
    k1, b, n_terms, topk = BM25_K1, BM25_B, BM25_N_TERMS, BM25_TOPK

    def sc(rk: int) -> str:
        return f"sum(CASE WHEN rk = {rk} THEN sc ELSE 0.0 END)"

    total = " + ".join(sc(rk) for rk in range(1, n_terms + 1))
    return f"""
WITH d AS (
  SELECT doc_id,
         regexp_split_to_array(trim(lower(text)), '[ \\t\\n\\x0B\\f\\r]+') AS t
  FROM documents WHERE trim(text) <> ''
), stats AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(len(t)) AS BIGINT) / CAST(count(*) AS BIGINT) AS avgdl
  FROM d
), vc AS (
  SELECT tok, CAST(count(*) AS BIGINT) AS c
  FROM (SELECT unnest(t) AS tok FROM d)
  GROUP BY 1 ORDER BY c DESC, tok LIMIT {n_terms}
), terms AS (
  SELECT tok, row_number() OVER (ORDER BY c DESC, tok) AS rk FROM vc
), dfs AS (
  SELECT tm.rk, tm.tok,
         (SELECT CAST(count(*) AS BIGINT) FROM d
          WHERE list_contains(d.t, tm.tok)) AS df
  FROM terms tm
), per AS (
  SELECT d.doc_id, f.rk,
         ln((s.n - f.df + 0.5) / (f.df + 0.5) + 1.0)
         * ((len(list_filter(d.t, x -> x = f.tok)) * {k1 + 1.0}) /
            (len(list_filter(d.t, x -> x = f.tok))
             + {k1} * ({1.0 - b} + {b} * (len(d.t) / s.avgdl)))) AS sc
  FROM d, dfs f, stats s
), agg AS (
  SELECT doc_id, {total} AS score FROM per GROUP BY doc_id
), ranked AS (
  SELECT doc_id,
         CAST(floor(score * 1000.0 + 0.5) AS BIGINT) AS bm25_e3
  FROM agg
)
SELECT doc_id, bm25_e3,
       CAST(row_number() OVER (ORDER BY bm25_e3 DESC, doc_id) AS BIGINT)
         AS rank
FROM ranked
ORDER BY bm25_e3 DESC, doc_id
LIMIT {topk}
"""


def _rrf_fusion_sql(k: int = RRF_K, topk: int = RRF_TOPK) -> str:
    """RRF oracle: the full `_bm25_sql` ranking as a subquery CTE
    (lexical list), the dense list as cosine-to-the-top-1-hit's
    embedding (list_cosine_similarity ::DOUBLE[] e5-floored — the
    knn_graph discipline, doc_id == vec_id), then the union fused by
    1e6 // (K + rank) with absent-list 0 — all-BIGINT fusion."""
    return f"""WITH lex AS (
  SELECT doc_id, rank AS r_lex FROM ({_bm25_sql()})
), q AS (
  SELECT embedding AS qe FROM embeddings
  WHERE vec_id = (SELECT doc_id FROM lex WHERE r_lex = 1)
), dense AS (
  SELECT doc_id,
         CAST(row_number() OVER (ORDER BY cos_e5 DESC, doc_id) AS BIGINT)
           AS r_dense
  FROM (
    SELECT e.vec_id AS doc_id,
           CAST(floor(list_cosine_similarity(
                 e.embedding::DOUBLE[], q.qe::DOUBLE[]) * 100000)
                AS BIGINT) AS cos_e5
    FROM embeddings e, q)
  ORDER BY cos_e5 DESC, doc_id
  LIMIT {topk}
), u AS (
  SELECT doc_id,
         CAST(coalesce(l.r_lex, 0) AS BIGINT) AS r_lex,
         CAST(coalesce(d.r_dense, 0) AS BIGINT) AS r_dense
  FROM lex l FULL JOIN dense d USING (doc_id)
), scored AS (
  SELECT doc_id, r_lex, r_dense,
         CAST(CASE WHEN r_lex > 0 THEN 1000000 // ({k} + r_lex) ELSE 0 END
            + CASE WHEN r_dense > 0 THEN 1000000 // ({k} + r_dense) ELSE 0 END
            AS BIGINT) AS rrf_e6
  FROM u
)
SELECT doc_id, r_lex, r_dense, rrf_e6,
       CAST(row_number() OVER (ORDER BY rrf_e6 DESC, doc_id) AS BIGINT)
         AS rank
FROM scored
ORDER BY rrf_e6 DESC, doc_id
LIMIT {topk}
"""


# Shared DSIR oracle body: md5 hex-digit buckets → smoothed log-ratio
# vector → per-doc mean, ending at a `scored(doc_id, lang, n_tok, s)`
# CTE both dsir oracles build on.  Mirrors dsir_weights_for exactly.
_DSIR_WEIGHTS_CTE = """
WITH toks AS (
  SELECT doc_id, lang, regexp_split_to_array(trim(lower(text)), '[ \\t\\n\\x0B\\f\\r]+') AS t
  FROM documents WHERE trim(text) <> ''
), tok AS (
  SELECT doc_id, lang,
         (strpos('0123456789abcdef', substr(md5(tok), 1, 1)) - 1) * 16
         + (strpos('0123456789abcdef', substr(md5(tok), 2, 1)) - 1) AS bu
  FROM (SELECT doc_id, lang, unnest(t) AS tok FROM toks)
), counts AS (
  SELECT bu % 64 AS bucket,
         CAST(count(*) AS BIGINT) AS c_raw,
         CAST(count(*) FILTER (WHERE lang = 'en') AS BIGINT) AS c_tgt
  FROM tok GROUP BY 1
), tot AS (
  SELECT sum(c_raw) AS t_raw, sum(c_tgt) AS t_tgt FROM counts
), lr AS (
  SELECT g.b AS bucket,
         ln((coalesce(c.c_tgt, 0) + 1) / (t.t_tgt + 64.0))
         - ln((coalesce(c.c_raw, 0) + 1) / (t.t_raw + 64.0)) AS lr
  FROM generate_series(0, 63) g(b)
  LEFT JOIN counts c ON c.bucket = g.b, tot t
), scored AS (
  SELECT tok.doc_id, any_value(tok.lang) AS lang,
         count(*) AS n_tok, sum(lr.lr) AS s
  FROM tok JOIN lr ON tok.bu % 64 = lr.bucket
  GROUP BY tok.doc_id
)
"""


def _shingles_sql(col: str) -> str:
    """Word-3-gram list expression over an arbitrary text column —
    the SQL mirror of `_word_shingles`."""
    w = f"regexp_split_to_array(lower(trim({col})), '[ \\t\\n\\x0B\\f\\r]+')"
    return f"""CASE WHEN len({w}) >= 3
      THEN list_transform(generate_series(1, len({w}) - 2),
                          i -> array_to_string({w}[i:i+2], ' '))
      ELSE [array_to_string({w}, ' ')] END"""


def _pii_sql() -> dict[str, str]:
    from rxtls_spark.functions.text import PII_EMAIL, PII_IPV4, PII_PHONE

    return {"email": PII_EMAIL, "ipv4": PII_IPV4, "phone": PII_PHONE}


def _stopword_list_sql() -> str:
    from rxtls_spark.functions.text import STOPWORDS

    return "[" + ", ".join(f"'{w}'" for w in STOPWORDS) + "]"


def _stopword_in_sql() -> str:
    from rxtls_spark.functions.text import STOPWORDS

    return ", ".join(f"'{w}'" for w in STOPWORDS)


def _tfidf_sql() -> str:
    return f"""
WITH d AS (
  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '[ \\t\\n\\x0B\\f\\r]+') AS t
  FROM documents WHERE trim(text) <> ''
), tok AS (
  SELECT doc_id, unnest(t) AS term FROM d
), tf AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
  FROM tok WHERE term NOT IN ({_stopword_in_sql()})
  GROUP BY 1, 2
), dfq AS (
  SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1
), n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM d),
ranked AS (
  SELECT tf.doc_id, tf.term, tf.tf, dfq.df,
         CAST(tf.tf AS DOUBLE) * (n.n / CAST(dfq.df AS DOUBLE)) AS score
  FROM tf JOIN dfq USING (term) CROSS JOIN n
)
SELECT doc_id, term, tf, df, score, CAST(rk AS BIGINT) AS rk
FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
                                   ORDER BY score DESC, term) AS rk
      FROM ranked)
WHERE rk <= {TFIDF_TOPK}
"""


def _bigram_lm_sql(vocab_k: int = BIGRAM_VOCAB_K) -> str:
    return f"""
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '[ \\t\\n\\x0B\\f\\r]+') AS t
  FROM documents WHERE trim(text) <> ''
), pairs AS (
  SELECT doc_id, list_transform(generate_series(1, len(t) - 1),
                                i -> t[i] || ' ' || t[i+1]) AS g2
  FROM toks
), bg AS (
  SELECT doc_id, unnest(g2) AS bg FROM pairs
), c2 AS (
  SELECT bg, CAST(count(*) AS BIGINT) AS cnt FROM bg
  GROUP BY 1 ORDER BY cnt DESC, bg LIMIT {vocab_k}
), c1 AS (
  SELECT tok, CAST(count(*) AS BIGINT) AS cnt
  FROM (SELECT unnest(t) AS tok FROM toks) GROUP BY 1
), v AS (
  SELECT c2.bg, ln(c2.cnt / CAST(c1.cnt AS DOUBLE)) AS lp
  FROM c2 JOIN c1 ON split_part(c2.bg, ' ', 1) = c1.tok
), scored AS (
  SELECT bg.doc_id, count(*) AS n_bg, count(v.lp) AS n_in, sum(v.lp) AS s
  FROM bg LEFT JOIN v USING (bg) GROUP BY 1
)
SELECT t.doc_id,
  CAST(coalesce(s.n_bg, 0) AS BIGINT) AS n_bigrams,
  CAST(coalesce(s.n_bg, 0) - coalesce(s.n_in, 0) AS BIGINT) AS n_oov,
  CASE WHEN s.n_in > 0 THEN floor(s.s / s.n_in * 1000.0 + 0.5) / 1000.0
  END AS avg_logprob
FROM toks t LEFT JOIN scored s ON t.doc_id = s.doc_id
"""


def _lm_eval_holdout_sql(vocab_k: int = BIGRAM_VOCAB_K) -> str:
    """lm_eval_holdout oracle: the bigram_lm_score SQL with the
    holdout permille rule attached to each doc and the c2/c1 vocab
    counts restricted to the train split."""
    kh = f"((doc_id % {KNUTH_P}) * {KNUTH_A}) % {KNUTH_P}"
    return f"""
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '[ \\t\\n\\x0B\\f\\r]+') AS t,
         CASE WHEN ({kh}) % 1000 >= {HOLDOUT_TEST_FROM} THEN 'test'
              WHEN ({kh}) % 1000 >= {HOLDOUT_VAL_FROM} THEN 'val'
              ELSE 'train' END AS split
  FROM documents WHERE trim(text) <> ''
), pairs AS (
  SELECT doc_id, split, list_transform(generate_series(1, len(t) - 1),
                                       i -> t[i] || ' ' || t[i+1]) AS g2
  FROM toks
), bg AS (
  SELECT doc_id, split, unnest(g2) AS bg FROM pairs
), c2 AS (
  SELECT bg, CAST(count(*) AS BIGINT) AS cnt FROM bg
  WHERE split = 'train'
  GROUP BY 1 ORDER BY cnt DESC, bg LIMIT {vocab_k}
), c1 AS (
  SELECT tok, CAST(count(*) AS BIGINT) AS cnt
  FROM (SELECT unnest(t) AS tok FROM toks WHERE split = 'train')
  GROUP BY 1
), v AS (
  SELECT c2.bg, ln(c2.cnt / CAST(c1.cnt AS DOUBLE)) AS lp
  FROM c2 JOIN c1 ON split_part(c2.bg, ' ', 1) = c1.tok
), scored AS (
  SELECT bg.doc_id, count(*) AS n_bg, count(v.lp) AS n_in, sum(v.lp) AS s
  FROM bg LEFT JOIN v USING (bg) GROUP BY 1
)
SELECT t.doc_id, t.split,
  CAST(coalesce(s.n_bg, 0) AS BIGINT) AS n_bigrams,
  CAST(coalesce(s.n_bg, 0) - coalesce(s.n_in, 0) AS BIGINT) AS n_oov,
  CASE WHEN s.n_in > 0 THEN floor(s.s / s.n_in * 1000.0 + 0.5) / 1000.0
  END AS avg_logprob
FROM toks t LEFT JOIN scored s ON t.doc_id = s.doc_id
"""


def _rho_loss_sql(vocab_k: int = BIGRAM_VOCAB_K) -> str:
    """rho_loss_select oracle: two lm_eval_holdout-shape vocab chains
    (train-split model and val-split model), train docs scored under
    both as e3-floored BIGINTs, top-RHO_TOPK by (rho DESC, doc_id).
    toks/bg are AS MATERIALIZED (the data_scaling precedent — both
    vocab builds reuse them)."""
    kh = f"((doc_id % {KNUTH_P}) * {KNUTH_A}) % {KNUTH_P}"
    head = f"""WITH toks AS MATERIALIZED (
  SELECT doc_id,
         regexp_split_to_array(trim(lower(text)), '[ \\t\\n\\x0B\\f\\r]+') AS t,
         ({kh}) % 1000 AS pm
  FROM documents WHERE trim(text) <> ''
), bg AS MATERIALIZED (
  SELECT doc_id, pm, unnest(g2) AS bg FROM (
    SELECT doc_id, pm,
           list_transform(generate_series(1, len(t) - 1),
                          i -> t[i] || ' ' || t[i+1]) AS g2
    FROM toks)
)"""
    conds = {
        "t": f"pm < {HOLDOUT_VAL_FROM}",
        "h": f"pm >= {HOLDOUT_VAL_FROM} AND pm < {HOLDOUT_TEST_FROM}",
    }
    for m, cond in conds.items():
        head += f""",
c2_{m} AS (
  SELECT bg, CAST(count(*) AS BIGINT) AS cnt FROM bg
  WHERE {cond}
  GROUP BY 1 ORDER BY cnt DESC, bg LIMIT {vocab_k}
), c1_{m} AS (
  SELECT tok, CAST(count(*) AS BIGINT) AS cnt
  FROM (SELECT unnest(t) AS tok FROM toks WHERE {cond})
  GROUP BY 1
), v_{m} AS (
  SELECT c2.bg, ln(c2.cnt / CAST(c1.cnt AS DOUBLE)) AS lp
  FROM c2_{m} c2 JOIN c1_{m} c1
    ON split_part(c2.bg, ' ', 1) = c1.tok
), sc_{m} AS (
  SELECT bg.doc_id, count(v.lp) AS n_in, sum(v.lp) AS s
  FROM bg LEFT JOIN v_{m} v USING (bg)
  WHERE bg.pm < {HOLDOUT_VAL_FROM}
  GROUP BY 1
)"""
    return head + f"""
SELECT t.doc_id,
       CAST(floor(t.s / t.n_in * 1000.0 + 0.5) AS BIGINT) AS lp_train_e3,
       CAST(floor(h.s / h.n_in * 1000.0 + 0.5) AS BIGINT) AS lp_holdout_e3,
       CAST(floor(h.s / h.n_in * 1000.0 + 0.5)
            - floor(t.s / t.n_in * 1000.0 + 0.5) AS BIGINT) AS rho_e3
FROM sc_t t JOIN sc_h h USING (doc_id)
WHERE t.n_in > 0 AND h.n_in > 0
ORDER BY rho_e3 DESC, doc_id LIMIT {RHO_TOPK}
"""


def _data_scaling_sql(vocab_k: int = BIGRAM_VOCAB_K) -> str:
    """data_scaling_curve oracle: the lm_eval_holdout CTE shape with
    the salted sel-permille attached, one (c2, c1, v, sc, agg) CTE
    group per nested fraction, UNION ALL of the per-source BIGINT
    rows.  toks/bg are AS MATERIALIZED (the doremi precedent — three
    vocab builds reuse them)."""
    kh = f"((doc_id % {KNUTH_P}) * {KNUTH_A}) % {KNUTH_P}"
    khs = f"(((doc_id + {SCALE_SALT}) % {KNUTH_P}) * {KNUTH_A}) % {KNUTH_P}"
    head = f"""WITH toks AS MATERIALIZED (
  SELECT doc_id, source,
         regexp_split_to_array(trim(lower(text)), '[ \\t\\n\\x0B\\f\\r]+') AS t,
         ({kh}) % 1000 AS pm,
         ({khs}) % 1000 AS sel
  FROM documents WHERE trim(text) <> ''
), bg AS MATERIALIZED (
  SELECT doc_id, pm, sel, unnest(g2) AS bg FROM (
    SELECT doc_id, pm, sel,
           list_transform(generate_series(1, len(t) - 1),
                          i -> t[i] || ' ' || t[i+1]) AS g2
    FROM toks)
)"""
    for thr in SCALE_FRACS:
        head += f""",
c2_{thr} AS (
  SELECT bg, CAST(count(*) AS BIGINT) AS cnt FROM bg
  WHERE pm < {HOLDOUT_VAL_FROM} AND sel < {thr}
  GROUP BY 1 ORDER BY cnt DESC, bg LIMIT {vocab_k}
), c1_{thr} AS (
  SELECT tok, CAST(count(*) AS BIGINT) AS cnt
  FROM (SELECT unnest(t) AS tok FROM toks
        WHERE pm < {HOLDOUT_VAL_FROM} AND sel < {thr})
  GROUP BY 1
), v_{thr} AS (
  SELECT c2.bg, ln(c2.cnt / CAST(c1.cnt AS DOUBLE)) AS lp
  FROM c2_{thr} c2 JOIN c1_{thr} c1
    ON split_part(c2.bg, ' ', 1) = c1.tok
), sc_{thr} AS (
  SELECT bg.doc_id, count(*) AS n_bg, count(v.lp) AS n_in, sum(v.lp) AS s
  FROM bg LEFT JOIN v_{thr} v USING (bg)
  WHERE bg.pm >= {HOLDOUT_VAL_FROM} GROUP BY 1
), agg_{thr} AS (
  SELECT t.source, CAST({thr} AS BIGINT) AS frac_permille,
    CAST(count(*) AS BIGINT) AS n_eval,
    CAST(count(CASE WHEN s.n_in > 0 THEN 1 END) AS BIGINT) AS n_scored,
    CAST(coalesce(sum(CASE WHEN s.n_in > 0
         THEN CAST(floor(s.s / s.n_in * 1000.0 + 0.5) AS BIGINT) END), 0)
         AS BIGINT) AS sum_lp_e3,
    CAST(sum(coalesce(s.n_bg, 0) - coalesce(s.n_in, 0)) AS BIGINT)
      AS sum_oov,
    CAST(sum(coalesce(s.n_bg, 0)) AS BIGINT) AS sum_bigrams
  FROM toks t LEFT JOIN sc_{thr} s USING (doc_id)
  WHERE t.pm >= {HOLDOUT_VAL_FROM}
  GROUP BY 1
)"""
    sel_sql = "\nUNION ALL\n".join(
        f"SELECT * FROM agg_{thr}" for thr in SCALE_FRACS
    )
    return head + "\n" + sel_sql


def _doremi_sql(vocab_k: int = 30) -> str:
    """DoReMi oracle: the `lm_score` unigram CTEs and the
    `bigram_lm_score` CTEs reduced to per-doc e3-BIGINT averages, a
    per-source exact-integer excess agg, then the EG loop UNROLLED one
    (u{{t}}, w{{t}}) CTE pair per iteration — every cross-row sum is
    BIGINT, every float a product/quotient of identical values.  The
    heavy CTEs are AS MATERIALIZED (the BPE precedent: DuckDB inlines
    CTEs by default and the w-chain would re-evaluate the corpus scan
    per reference)."""
    base = f"""WITH toks AS MATERIALIZED (
  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '[ \\t\\n\\x0B\\f\\r]+') AS t
  FROM documents WHERE trim(text) <> ''
), tok AS (
  SELECT doc_id, unnest(t) AS tok FROM toks
), vc AS (
  SELECT tok, CAST(count(*) AS BIGINT) AS cnt FROM tok
  GROUP BY 1 ORDER BY cnt DESC, tok LIMIT {vocab_k}
), v AS (
  SELECT tok, ln(cnt / (SELECT sum(cnt) FROM vc)::DOUBLE) AS lp FROM vc
), uscored AS (
  SELECT tk.doc_id, count(v.lp) AS n_in, sum(v.lp) AS s
  FROM tok tk LEFT JOIN v USING (tok) GROUP BY 1
), uni_doc AS (
  SELECT doc_id, CAST(floor(s / n_in * 1000.0 + 0.5) AS BIGINT) AS lp_e3
  FROM uscored WHERE n_in > 0
), g2 AS (
  SELECT doc_id, unnest(list_transform(generate_series(1, len(t) - 1),
                                       i -> t[i] || ' ' || t[i+1])) AS bg
  FROM toks
), c2 AS (
  SELECT bg, CAST(count(*) AS BIGINT) AS cnt FROM g2
  GROUP BY 1 ORDER BY cnt DESC, bg LIMIT {vocab_k}
), c1 AS (
  SELECT tok, CAST(count(*) AS BIGINT) AS cnt
  FROM (SELECT unnest(t) AS tok FROM toks) GROUP BY 1
), v2 AS (
  SELECT c2.bg, ln(c2.cnt / CAST(c1.cnt AS DOUBLE)) AS lp
  FROM c2 JOIN c1 ON split_part(c2.bg, ' ', 1) = c1.tok
), bscored AS (
  SELECT g2.doc_id, count(v2.lp) AS n_in, sum(v2.lp) AS s
  FROM g2 LEFT JOIN v2 USING (bg) GROUP BY 1
), big_doc AS (
  SELECT doc_id, CAST(floor(s / n_in * 1000.0 + 0.5) AS BIGINT) AS lp_e3
  FROM bscored WHERE n_in > 0
), dom AS MATERIALIZED (
  SELECT d.source, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(greatest(0, b.lp_e3 - u.lp_e3)) AS BIGINT) AS sum_excess_e3
  FROM uni_doc u JOIN big_doc b USING (doc_id)
  JOIN documents d USING (doc_id)
  GROUP BY 1
), w0 AS MATERIALIZED (
  SELECT source, n_docs, sum_excess_e3,
         sum_excess_e3 / (n_docs * 1000.0) AS mx,
         1.0 / (SELECT count(*) FROM dom) AS w
  FROM dom
)"""
    for t in range(1, DOREMI_ITERS + 1):
        base += f""",
u{t} AS MATERIALIZED (
  SELECT source, n_docs, sum_excess_e3, mx,
         CAST(floor((w * exp({DOREMI_ETA} * mx)) * 1000000000 + 0.5)
              AS BIGINT) AS ue
  FROM w{t - 1}
), w{t} AS MATERIALIZED (
  SELECT source, n_docs, sum_excess_e3, mx,
         ue / (SELECT CAST(sum(ue) AS DOUBLE) FROM u{t}) AS w
  FROM u{t}
)"""
    selects = [
        f"SELECT source, n_docs, sum_excess_e3, CAST({t} AS BIGINT) AS iter,"
        f" floor(w * 1000000 + 0.5) / 1000000 AS weight FROM w{t}"
        for t in range(DOREMI_ITERS + 1)
    ]
    selects.append(
        f"""SELECT source, n_docs, sum_excess_e3,
  CAST({DOREMI_ITERS + 1} AS BIGINT) AS iter,
  floor(((1.0 - {DOREMI_SMOOTH_NUM}/{DOREMI_SMOOTH_DEN}.0) * w
         + {DOREMI_SMOOTH_NUM}/{DOREMI_SMOOTH_DEN}.0
           / (SELECT count(*) FROM dom)) * 1000000 + 0.5) / 1000000 AS weight
FROM w{DOREMI_ITERS}"""
    )
    return base + "\n" + "\nUNION ALL\n".join(selects)


def _cascade_v_ctes() -> str:
    """The WITH-chain ending at ``v`` (doc_id, lang, source, verdict)
    — shared by the `filter_cascade` and `source_funnel` oracles."""
    return f"""WITH {_scored_feats_ctes()},
{_REP_CTES},
rep AS (
  SELECT b.doc_id,
    floor(b.dup_word_frac * 100000 + 0.5) / 100000 AS dwf,
    floor(coalesce(g2m.top_chars, 0) / CAST(b.n_chars AS DOUBLE)
          * 100000 + 0.5) / 100000 AS t2f,
    floor(coalesce(g3d.dup_chars, 0) / CAST(b.n_chars AS DOUBLE)
          * 100000 + 0.5) / 100000 AS d3f
  FROM base b
  LEFT JOIN g2m ON b.doc_id = g2m.doc_id
  LEFT JOIN g3d ON b.doc_id = g3d.doc_id
),
v AS (
  SELECT f.doc_id, f.lang, d.source,
    CASE WHEN trim(f.text) = '' THEN 'empty'
         WHEN f.n_tokens < {CASCADE_MIN_TOKENS} THEN 'too_short'
         WHEN f.lang_guess = 'und' THEN 'lang_unknown'
         WHEN rep.dwf > {CASCADE_DUP_WORD_MAX} THEN 'dup_words'
         WHEN rep.t2f > {CASCADE_TOP2_MAX} THEN 'top2gram'
         WHEN rep.d3f > {CASCADE_DUP3_MAX} THEN 'dup3gram'
         WHEN {_QUALITY_SQL} < {CASCADE_MIN_QUALITY} THEN 'low_quality'
         ELSE 'kept' END AS verdict
  FROM feats f
  JOIN rep ON f.doc_id = rep.doc_id
  JOIN (SELECT doc_id, source FROM documents) d ON f.doc_id = d.doc_id
)"""


def _filter_cascade_sql() -> str:
    return (
        _cascade_v_ctes()
        + """
SELECT doc_id, lang, verdict,
  CAST(CASE verdict WHEN 'empty' THEN 0 WHEN 'too_short' THEN 1
       WHEN 'lang_unknown' THEN 2 WHEN 'dup_words' THEN 3
       WHEN 'top2gram' THEN 4 WHEN 'dup3gram' THEN 5
       WHEN 'low_quality' THEN 6 ELSE 7 END AS BIGINT) AS stage
FROM v
"""
    )


def _source_funnel_sql() -> str:
    return (
        _cascade_v_ctes()
        + """,
c AS (
  SELECT source, verdict, CAST(count(*) AS BIGINT) AS n
  FROM v GROUP BY 1, 2
), t AS (
  SELECT source, CAST(sum(n) AS BIGINT) AS total FROM c GROUP BY 1
)
SELECT c.source, c.verdict, c.n,
       CAST(c.n AS DOUBLE) / CAST(t.total AS DOUBLE) AS share
FROM c JOIN t ON c.source = t.source
"""
    )


def _ngram_novelty_sql(w: int = NOVELTY_W) -> str:
    gram = " || ' ' || ".join(f"t[i+{j}]" if j else "t[i]" for j in range(w))
    return f"""
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '[ \\t\\n\\x0B\\f\\r]+') AS t
  FROM documents WHERE trim(text) <> ''
), grams AS (
  SELECT doc_id, list_transform(generate_series(1, len(t) - {w - 1}),
                                i -> {gram}) AS g
  FROM toks
), pairs AS (
  SELECT DISTINCT doc_id, unnest(g) AS gram FROM grams
), dfc AS (
  SELECT gram, CAST(count(*) AS BIGINT) AS n_docs FROM pairs GROUP BY 1
), per AS (
  SELECT p.doc_id, count(*) AS n_grams,
         sum(CASE WHEN d.n_docs = 1 THEN 1 ELSE 0 END) AS n_novel
  FROM pairs p JOIN dfc d ON p.gram = d.gram
  GROUP BY 1
)
SELECT doc_id, CAST(n_grams AS BIGINT) AS n_grams,
       CAST(n_novel AS BIGINT) AS n_novel,
       CAST(n_novel AS DOUBLE) / CAST(n_grams AS DOUBLE) AS novelty
FROM per
"""


def _curriculum_sql() -> str:
    return f"""
WITH {_scored_feats_ctes()},
q AS (SELECT doc_id, {_QUALITY_SQL} AS quality FROM feats),
k AS (
  SELECT doc_id, quality,
    CAST(floor(quality * 100000 + 0.5) AS BIGINT) AS qnum,
    ((doc_id % {KNUTH_P}) * {KNUTH_A}) % {KNUTH_P} AS order_key
  FROM q
), s AS (
  SELECT doc_id, quality, order_key,
    CASE WHEN qnum >= {CURRICULUM_HI_FROM} THEN 0
         WHEN qnum >= {CURRICULUM_MID_FROM} THEN 1 ELSE 2 END AS stage,
    order_key % {SHUFFLE_N_SHARDS} AS shard
  FROM k
)
SELECT doc_id, CAST(stage AS BIGINT) AS stage, CAST(shard AS BIGINT) AS shard,
  CAST(row_number() OVER (PARTITION BY stage, shard
                          ORDER BY order_key, doc_id) - 1 AS BIGINT) AS pos,
  CAST(order_key AS BIGINT) AS order_key, quality
FROM s
"""


def _ccnet_sql(vocab_k: int = 30) -> str:
    """CCNet-buckets oracle: the `lm_score` unigram CTEs reduced to
    the e3-floored per-doc BIGINT, then the tercile-threshold chain in
    exact integer arithmetic — cum(v) over a bounded (lang, lp_e3)
    histogram, cut values via max(CASE...), bucket CASE on integer
    compares (the identical rule as the Spark side)."""
    return f"""WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '[ \\t\\n\\x0B\\f\\r]+') AS t
  FROM documents WHERE trim(text) <> ''
), tok AS (
  SELECT doc_id, unnest(t) AS tok FROM toks
), vc AS (
  SELECT tok, CAST(count(*) AS BIGINT) AS cnt FROM tok
  GROUP BY 1 ORDER BY cnt DESC, tok LIMIT {vocab_k}
), v AS (
  SELECT tok, ln(cnt / (SELECT sum(cnt) FROM vc)::DOUBLE) AS lp FROM vc
), scored AS (
  SELECT tk.doc_id, count(v.lp) AS n_in, sum(v.lp) AS s
  FROM tok tk LEFT JOIN v USING (tok) GROUP BY 1
), doc_e3 AS (
  SELECT s.doc_id, d.lang,
         CAST(floor(s.s / s.n_in * 1000.0 + 0.5) AS BIGINT) AS lp_e3
  FROM scored s JOIN documents d USING (doc_id) WHERE s.n_in > 0
), hist AS (
  SELECT lang, lp_e3, CAST(count(*) AS BIGINT) AS cnt FROM doc_e3
  GROUP BY 1, 2
), cum AS (
  SELECT lang, lp_e3,
    sum(cnt) OVER (PARTITION BY lang ORDER BY lp_e3 DESC) AS cum,
    sum(cnt) OVER (PARTITION BY lang) AS n
  FROM hist
), cuts AS (
  SELECT lang,
    max(CASE WHEN cum >= (n + 2) // 3 THEN lp_e3 END) AS t1,
    max(CASE WHEN cum >= (2 * n + 2) // 3 THEN lp_e3 END) AS t2
  FROM cum GROUP BY 1
)
SELECT d.doc_id, d.lang, d.lp_e3,
  CASE WHEN d.lp_e3 >= c.t1 THEN 'head'
       WHEN d.lp_e3 >= c.t2 THEN 'middle'
       ELSE 'tail' END AS bucket
FROM doc_e3 d JOIN cuts c USING (lang)
"""


def _exsub_sql(k: int = EXSUB_K) -> str:
    """ExactSubstr oracle: identical union (base + full copies + token
    first-half copies), sliding k-grams via unnest(generate_series),
    duplicate test as count() over the gram partition, coverage as the
    lag-based interval union (first dup start contributes K via the
    lag default pos-K) — BIGINT end to end."""
    return f"""WITH toks0 AS (
  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '[ \\t\\n\\x0B\\f\\r]+') AS t
  FROM documents WHERE trim(text) <> ''
), uni AS (
  SELECT doc_id, t FROM toks0
  UNION ALL
  SELECT doc_id + {SPAN_DUP_OFFSET}, t FROM toks0 WHERE doc_id % 20 = 0
  UNION ALL
  SELECT doc_id + {EXSUB_HALF_OFFSET}, t[1 : (len(t) + 1) // 2]
  FROM toks0 WHERE doc_id % 16 = 3
), g0 AS (
  SELECT doc_id, t,
         unnest(generate_series(1, len(t) - {k} + 1)) AS i
  FROM uni WHERE len(t) >= {k}
), g AS (
  SELECT doc_id, i - 1 AS pos,
         array_to_string(t[i : i + {k} - 1], ' ') AS gram
  FROM g0
), occ AS (
  SELECT doc_id, pos, count(*) OVER (PARTITION BY gram) AS n_occ FROM g
), gstats AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams,
         CAST(sum(CASE WHEN n_occ >= 2 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_dup_grams
  FROM occ GROUP BY 1
), deltas AS (
  SELECT doc_id,
    least({k}, pos - lag(pos, 1, pos - {k})
                 OVER (PARTITION BY doc_id ORDER BY pos)) AS step
  FROM occ WHERE n_occ >= 2
), cov AS (
  SELECT doc_id, CAST(sum(step) AS BIGINT) AS n_dup_tokens FROM deltas
  GROUP BY 1
)
SELECT u.doc_id, CAST(len(u.t) AS BIGINT) AS n_tokens,
  CAST(coalesce(s.n_grams, 0) AS BIGINT) AS n_grams,
  CAST(coalesce(s.n_dup_grams, 0) AS BIGINT) AS n_dup_grams,
  CAST(coalesce(c.n_dup_tokens, 0) AS BIGINT) AS n_dup_tokens
FROM uni u
LEFT JOIN gstats s USING (doc_id)
LEFT JOIN cov c USING (doc_id)
"""


def _unicode_nfc_sql() -> str:
    """NFC oracle: identical decomposed-suffix injection via chr(),
    DuckDB's native nfc_normalize vs the Spark UDF's
    unicodedata.normalize('NFC') — same Unicode standard, md5-exact
    (verified on combining-mark inputs)."""
    return """WITH staged AS (
  SELECT doc_id,
    CASE WHEN doc_id % 7 = 2
      THEN text || ' cafe' || chr(769) || ' nai' || chr(776) || 've'
      ELSE text END AS raw
  FROM documents
)
SELECT doc_id,
  CAST(length(raw) AS BIGINT) AS n_chars_raw,
  CAST(length(nfc_normalize(raw)) AS BIGINT) AS n_chars_nfc,
  CAST(CASE WHEN md5(raw) <> md5(nfc_normalize(raw)) THEN 1 ELSE 0 END
       AS BIGINT) AS changed,
  md5(nfc_normalize(raw)) AS nfc_md5
FROM staged
"""


def _inverted_index_sql(topk: int = IDX_TOPK) -> str:
    """Inverted-index oracle: top-K vocab, token positions via
    unnest(generate_series) (0-based like posexplode), one
    (term, doc) group — all BIGINT."""
    return f"""WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '[ \\t\\n\\x0B\\f\\r]+') AS t
  FROM documents WHERE trim(text) <> ''
), tok AS (
  SELECT doc_id, unnest(t) AS tok FROM toks
), vc AS (
  SELECT tok FROM (
    SELECT tok, count(*) AS cnt FROM tok
    GROUP BY 1 ORDER BY cnt DESC, tok LIMIT {topk})
), px AS (
  SELECT doc_id, t, unnest(generate_series(1, len(t))) AS i FROM toks
), p AS (
  SELECT doc_id, t[i] AS term, i - 1 AS pos FROM px
)
SELECT p.term, p.doc_id, CAST(count(*) AS BIGINT) AS tf,
  CAST(min(pos) AS BIGINT) AS first_pos,
  CAST(max(pos) AS BIGINT) AS last_pos
FROM p JOIN vc ON p.term = vc.tok
GROUP BY 1, 2
"""


def _bloom_dedup_sql(
    m: int = BLOOM_M_BITS, k: int = BLOOM_K, off: int = BLOOM_H2_OFFSET
) -> str:
    """Bloom oracle: identical injected-dup corpus, 52-bit md5-prefix
    key ('0x'||hex cast == Spark conv), identical knuth double-hashing
    positions, first-setter min-doc_id rule — all BIGINT, exact by
    construction."""
    return (
        _DUPS_CTE.rstrip()
        + f""",
keyed AS (
  SELECT doc_id, ('0x' || substr(md5(text), 1, 13))::BIGINT AS k FROM docs
), h AS (
  SELECT doc_id,
    ((k % {KNUTH_P}) * {KNUTH_A}) % {KNUTH_P} AS h1,
    (((k + {off}) % {KNUTH_P}) * {KNUTH_A}) % {KNUTH_P} AS h2
  FROM keyed
), px AS (
  SELECT doc_id, (h1 + j * h2) % {m} AS pos
  FROM h CROSS JOIN (SELECT unnest(generate_series(0, {k - 1})) AS j)
), fs AS (
  SELECT pos, min(doc_id) AS first_setter FROM px GROUP BY 1
), flagged AS (
  SELECT px.doc_id,
    min(CASE WHEN fs.first_setter < px.doc_id THEN 1 ELSE 0 END) AS bloom_dup
  FROM px JOIN fs USING (pos) GROUP BY 1
), exact AS (
  SELECT doc_id,
    CASE WHEN min(doc_id) OVER (PARTITION BY k) < doc_id
         THEN 1 ELSE 0 END AS exact_dup
  FROM keyed
)
SELECT e.doc_id, CAST(e.exact_dup AS BIGINT) AS exact_dup,
  CAST(f.bloom_dup AS BIGINT) AS bloom_dup,
  CASE WHEN e.exact_dup = 1 AND f.bloom_dup = 1 THEN 'dup'
       WHEN f.bloom_dup = 1 THEN 'false_positive'
       WHEN e.exact_dup = 1 THEN 'missed'
       ELSE 'unique' END AS verdict
FROM exact e JOIN flagged f ON e.doc_id = f.doc_id
"""
    )


def _url_canonicalize_sql(
    hm: int = URL_HOST_MOD, pm: int = URL_PATH_MOD, im: int = URL_ID_MOD
) -> str:
    """URL oracle: identical raw-URL injection formula, then the same
    canonicalization chain via DuckDB's string/list functions
    (split_part/string_split/[i]/list_filter/list_sort) — the two
    regexes are anchored and RE2==Java-regex safe."""
    return f"""WITH staged AS (
  SELECT doc_id,
    (CASE WHEN doc_id % 3 = 0 THEN 'HTTPS' ELSE 'https' END) || '://' ||
    (CASE WHEN doc_id % 3 = 0
       THEN upper('www.example' || CAST(doc_id % {hm} AS VARCHAR) || '.com')
       ELSE 'www.example' || CAST(doc_id % {hm} AS VARCHAR) || '.com' END) ||
    (CASE WHEN doc_id % 5 = 0 THEN ':443' ELSE '' END) ||
    '/articles/' || CAST(doc_id % {pm} AS VARCHAR) ||
    (CASE WHEN doc_id % 4 = 0 THEN '/' ELSE '' END) ||
    '?' ||
    (CASE WHEN doc_id % 2 = 0
       THEN 'utm_source=feed&id=' || CAST(doc_id % {im} AS VARCHAR) || '&ref=rss'
       ELSE 'ref=rss&id=' || CAST(doc_id % {im} AS VARCHAR) || '&utm_campaign=x'
     END) ||
    (CASE WHEN doc_id % 6 = 0 THEN '#section-2' ELSE '' END) AS raw_url
  FROM documents
), c1 AS (
  SELECT doc_id, raw_url,
    split_part(raw_url, '#', 1) AS nofrag
  FROM staged
), c2 AS (
  SELECT doc_id, raw_url,
    split_part(nofrag, '?', 1) AS base,
    CASE WHEN position('?' IN nofrag) > 0
         THEN split_part(nofrag, '?', 2) ELSE '' END AS query
  FROM c1
), c3 AS (
  SELECT doc_id, raw_url, query,
    string_split(base, '/') AS parts
  FROM c2
), c4 AS (
  SELECT doc_id, raw_url,
    lower(parts[1]) AS scheme,
    regexp_replace(lower(parts[3]), ':443$', '') AS hostp,
    regexp_replace('/' || array_to_string(parts[4:], '/'), '/+$', '') AS path0,
    array_to_string(
      list_sort(list_filter(string_split(query, '&'),
        p -> p NOT LIKE 'utm_%' AND p NOT LIKE 'fbclid=%'
         AND p NOT LIKE 'gclid=%' AND p <> '')), '&') AS qs
  FROM c3
), canon AS (
  SELECT doc_id, raw_url,
    scheme || '//' || hostp ||
    (CASE WHEN path0 = '' THEN '/' ELSE path0 END) ||
    (CASE WHEN qs = '' THEN '' ELSE '?' || qs END) AS canon_url
  FROM c4
)
SELECT doc_id, raw_url, canon_url,
  CAST(count(*) OVER (PARTITION BY canon_url) AS BIGINT) AS n_variants,
  CAST(CASE WHEN min(doc_id) OVER (PARTITION BY canon_url) = doc_id
       THEN 1 ELSE 0 END AS BIGINT) AS is_keeper
FROM canon
"""


def _pagerank_sql(
    outdeg: int = PR_OUTDEG, iters: int = PR_ITERS
) -> str:
    """PageRank oracle: identical knuth-hash edge generation, then the
    damped iteration UNROLLED one (c{t}, r{t}) CTE pair per step —
    pure BIGINT arithmetic end to end (e9 ranks, DIV contributions,
    exact integer incoming sums), so the match is exact by
    construction, not by rounding."""
    head = f"""WITH ids AS (
  SELECT doc_id FROM documents
), nn AS (
  SELECT CAST(count(*) AS BIGINT) AS n FROM ids
), e0 AS (
  SELECT doc_id AS src,
         unnest(generate_series(0, {outdeg - 1})) AS j
  FROM ids
), e1 AS (
  SELECT src,
         ((((src * {outdeg} + j) % {KNUTH_P}) * {KNUTH_A}) % {KNUTH_P})
           % (SELECT n FROM nn) AS dst
  FROM e0
), e2 AS (
  SELECT src, dst FROM e1 WHERE dst <> src
), od AS (
  SELECT src, CAST(count(*) AS BIGINT) AS outdeg FROM e2 GROUP BY 1
), e AS (
  SELECT e2.src, e2.dst, od.outdeg FROM e2 JOIN od USING (src)
), r0 AS (
  SELECT doc_id,
         CAST(1000000000 // (SELECT n FROM nn) AS BIGINT) AS r
  FROM ids
)"""
    for t in range(1, iters + 1):
        head += f""",
c{t} AS (
  SELECT e.dst, CAST(sum(r{t - 1}.r // e.outdeg) AS BIGINT) AS inc
  FROM e JOIN r{t - 1} ON e.src = r{t - 1}.doc_id GROUP BY 1
), r{t} AS (
  SELECT i.doc_id,
         CAST(15000000000 // (100 * (SELECT n FROM nn))
              + (85 * coalesce(c{t}.inc, 0)) // 100 AS BIGINT) AS r
  FROM ids i LEFT JOIN c{t} ON i.doc_id = c{t}.dst
)"""
    return head + f"""
SELECT i.doc_id,
  CAST(coalesce(od.outdeg, 0) AS BIGINT) AS outdeg,
  CAST(coalesce(ind.indeg, 0) AS BIGINT) AS indeg,
  r{iters}.r AS r_e9
FROM ids i
LEFT JOIN od ON i.doc_id = od.src
LEFT JOIN (
  SELECT dst, CAST(count(*) AS BIGINT) AS indeg FROM e2 GROUP BY 1
) ind ON i.doc_id = ind.dst
JOIN r{iters} ON i.doc_id = r{iters}.doc_id
"""


def _hits_sql(outdeg: int = PR_OUTDEG, iters: int = HITS_ITERS) -> str:
    """HITS oracle: the pagerank edge CTEs, then each iteration
    UNROLLED as four CTEs (authority raw sum, L1 normalize, hub raw
    sum, L1 normalize) — all BIGINT, exact by construction."""
    head = f"""WITH ids AS (
  SELECT doc_id FROM documents
), nn AS (
  SELECT CAST(count(*) AS BIGINT) AS n FROM ids
), e0 AS (
  SELECT doc_id AS src,
         unnest(generate_series(0, {outdeg - 1})) AS j
  FROM ids
), e1 AS (
  SELECT src,
         ((((src * {outdeg} + j) % {KNUTH_P}) * {KNUTH_A}) % {KNUTH_P})
           % (SELECT n FROM nn) AS dst
  FROM e0
), e AS (
  SELECT src, dst FROM e1 WHERE dst <> src
), h0 AS (
  SELECT doc_id,
         CAST(1000000000 // (SELECT n FROM nn) AS BIGINT) AS s
  FROM ids
)"""
    for t in range(1, iters + 1):
        head += f""",
ar{t} AS (
  SELECT e.dst, CAST(sum(h{t - 1}.s) AS BIGINT) AS raw
  FROM e JOIN h{t - 1} ON e.src = h{t - 1}.doc_id GROUP BY 1
), a{t} AS (
  SELECT dst AS doc_id,
         CAST((raw * 1000000000)
              // (SELECT sum(raw) FROM ar{t}) AS BIGINT) AS s
  FROM ar{t}
), hr{t} AS (
  SELECT e.src, CAST(sum(a{t}.s) AS BIGINT) AS raw
  FROM e JOIN a{t} ON e.dst = a{t}.doc_id GROUP BY 1
), h{t} AS (
  SELECT src AS doc_id,
         CAST((raw * 1000000000)
              // (SELECT sum(raw) FROM hr{t}) AS BIGINT) AS s
  FROM hr{t}
)"""
    return head + f"""
SELECT i.doc_id,
  CAST(coalesce(a{iters}.s, 0) AS BIGINT) AS auth_e9,
  CAST(coalesce(h{iters}.s, 0) AS BIGINT) AS hub_e9
FROM ids i
LEFT JOIN a{iters} ON i.doc_id = a{iters}.doc_id
LEFT JOIN h{iters} ON i.doc_id = h{iters}.doc_id
"""


def _rake_sql() -> str:
    """rake_keywords oracle: identical stoplist, gaps-and-islands
    phrase grouping, degree/frequency word scores and the top-k
    window."""
    from rxtls_spark.functions.text import STOPWORDS

    stoplist = ", ".join(f"'{w}'" for w in STOPWORDS)
    return f"""
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '[ \\t\\n\\x0B\\f\\r]+') AS t
  FROM documents WHERE trim(text) <> ''
), tok AS (
  SELECT doc_id, unnest(t) AS tok,
         unnest(generate_series(1, len(t))) AS pos
  FROM toks
), nonstop AS (
  SELECT * FROM tok WHERE tok NOT IN ({stoplist})
), grp AS (
  SELECT doc_id, pos, tok,
         pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
  FROM nonstop
), phr AS (
  SELECT doc_id, grp, string_agg(tok, ' ' ORDER BY pos) AS phrase,
         CAST(count(*) AS BIGINT) AS plen
  FROM grp GROUP BY 1, 2
), ptok AS (
  SELECT g.doc_id, g.grp, g.tok, p.plen
  FROM grp g JOIN phr p USING (doc_id, grp)
), wsc AS (
  SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS freq,
         CAST(sum(plen) AS BIGINT) AS deg
  FROM ptok GROUP BY 1, 2
), wsc2 AS (
  SELECT doc_id, tok, (deg * 1000) // freq AS wscore FROM wsc
), psc AS (
  SELECT t.doc_id, t.grp, CAST(sum(w.wscore) AS BIGINT) AS score_e3
  FROM ptok t JOIN wsc2 w ON t.doc_id = w.doc_id AND t.tok = w.tok
  GROUP BY 1, 2
), ph2 AS (
  SELECT p.doc_id, p.phrase,
         CAST(max(p.plen) AS BIGINT) AS n_words,
         CAST(max(s.score_e3) AS BIGINT) AS score_e3,
         CAST(count(*) AS BIGINT) AS n_occ
  FROM phr p JOIN psc s USING (doc_id, grp)
  GROUP BY 1, 2
), ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY doc_id ORDER BY score_e3 DESC, phrase) AS rk
  FROM ph2
)
SELECT doc_id, phrase, n_words, score_e3, n_occ, CAST(rk AS BIGINT) AS rk
FROM ranked WHERE rk <= {RAKE_TOPK}
"""


def _blocklist_sql() -> str:
    """blocklist_filter oracle: the identical length-delta occurrence
    counts, weighted severity, and ordered verdict CASE."""
    occ = {
        p: (
            f"(length(lower(text)) - length(replace(lower(text),"
            f" '{p}', ''))) // {len(p)}"
        )
        for p, _ in BLOCK_PHRASES
    }
    cols = ",\n  ".join(
        f"CAST({occ[p]} AS BIGINT) AS n_{p.replace(' ', '_')}"
        for p, _ in BLOCK_PHRASES
    )
    sev = " + ".join(f"({occ[p]}) * {w}" for p, w in BLOCK_PHRASES)
    return f"""
SELECT doc_id,
  {cols},
  CAST({sev} AS BIGINT) AS severity,
  CASE WHEN {sev} >= {BLOCK_T_BLOCK} THEN 'block'
       WHEN {sev} >= {BLOCK_T_REVIEW} THEN 'review'
       ELSE 'clean' END AS verdict
FROM documents
"""


def _char_entropy_sql() -> str:
    """char_entropy oracle: identical bucket counts (length-delta per
    literal char), the e3-floored ln fold over the count list, and one
    truncating division."""
    cols = ", ".join(
        f"CAST(length(t) - length(replace(t, '{c}', '')) AS BIGINT)"
        for c in ENTROPY_CHARS
    )
    return f"""
WITH base AS (
  SELECT doc_id, lower(text) AS t FROM documents WHERE length(text) > 0
), cn AS (
  SELECT doc_id, CAST(length(t) AS BIGINT) AS n, [{cols}] AS cs
  FROM base
), witho AS (
  SELECT doc_id, n,
         CAST(n - list_sum(cs) AS BIGINT) AS n_other,
         list_append(cs, CAST(n - list_sum(cs) AS BIGINT)) AS cs2
  FROM cn
), hh AS (
  SELECT doc_id, n, n_other,
    CAST(list_sum(list_transform(cs2, c -> CASE WHEN c > 0
      THEN c * (CAST(floor(ln(CAST(n AS DOUBLE)) * 1000.0) AS BIGINT)
                - CAST(floor(ln(CAST(c AS DOUBLE)) * 1000.0) AS BIGINT))
      ELSE 0 END)) AS BIGINT) AS h_sum_e3
  FROM witho
)
SELECT doc_id, n AS n_chars_l, n_other, h_sum_e3,
       CAST(h_sum_e3 // n AS BIGINT) AS entropy_e3
FROM hh
"""


def oracle_sql_training() -> dict[str, str]:
    oracles = _oracle_sql_training_literal()
    # the broadcast-UDF path computes the identical result, so it
    # shares lm_score's oracle verbatim
    oracles["lm_score_broadcast"] = oracles["lm_score"]
    return oracles


def _oracle_sql_training_literal() -> dict[str, str]:
    return {
        "blocklist_filter": _blocklist_sql(),
        "char_entropy": _char_entropy_sql(),
        "rake_keywords": _rake_sql(),
        "dataset_card": """
WITH base AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs,
         CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
         CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
         CAST(sum(length(text)) AS BIGINT) AS n_chars,
         CAST(sum(CASE WHEN trim(text) = '' THEN 0
              ELSE len(regexp_split_to_array(trim(lower(text)), '[ \\t\\n\\x0B\\f\\r]+'))
              END) AS BIGINT) AS n_tokens,
         CAST(sum(CASE WHEN trim(text) = '' THEN 1 ELSE 0 END) AS BIGINT) AS n_empty
  FROM documents
), dups AS (
  SELECT CAST(sum(c - 1) AS BIGINT) AS n_exact_dup_docs,
         CAST(sum(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_groups
  FROM (SELECT md5(text) AS h, count(*) AS c FROM documents GROUP BY 1)
), emb AS (
  SELECT CAST(count(*) AS BIGINT) AS n_vectors,
         CAST(count(DISTINCT label) AS BIGINT) AS n_labels
  FROM embeddings
)
SELECT m.metric, CASE m.metric
  WHEN 'n_docs' THEN base.n_docs
  WHEN 'n_sources' THEN base.n_sources
  WHEN 'n_langs' THEN base.n_langs
  WHEN 'n_chars' THEN base.n_chars
  WHEN 'n_tokens' THEN base.n_tokens
  WHEN 'n_empty' THEN base.n_empty
  WHEN 'n_exact_dup_docs' THEN dups.n_exact_dup_docs
  WHEN 'n_dup_groups' THEN dups.n_dup_groups
  WHEN 'n_vectors' THEN emb.n_vectors
  WHEN 'n_labels' THEN emb.n_labels
  END AS value
FROM (SELECT unnest(['n_docs','n_sources','n_langs','n_chars','n_tokens',
                     'n_empty','n_exact_dup_docs','n_dup_groups',
                     'n_vectors','n_labels']) AS metric) m, base, dups, emb
""",
        "oov_curve": f"""
WITH toks AS (
  SELECT regexp_split_to_array(trim(lower(text)), '[ \\t\\n\\x0B\\f\\r]+') AS t
  FROM documents WHERE trim(text) <> ''
), cnt AS (
  SELECT tok, CAST(count(*) AS BIGINT) AS cnt
  FROM (SELECT unnest(t) AS tok FROM toks) GROUP BY 1
), tot AS (
  SELECT CAST(sum(cnt) AS BIGINT) AS t,
         CAST(count(*) AS BIGINT) AS n_types
  FROM cnt
), ranked AS (
  SELECT cnt, row_number() OVER (ORDER BY cnt DESC, tok) AS rk FROM cnt
), grid AS (
  SELECT CAST(unnest([{', '.join(str(k) for k in OOV_GRID)}]) AS BIGINT) AS vocab_k
), cov AS (
  SELECT g.vocab_k, CAST(coalesce(sum(r.cnt), 0) AS BIGINT) AS cov_tokens
  FROM grid g LEFT JOIN ranked r ON r.rk <= g.vocab_k
  GROUP BY 1
)
SELECT c.vocab_k,
       CAST(least(c.vocab_k, tot.n_types) AS BIGINT) AS n_types,
       c.cov_tokens,
       CAST(((tot.t - c.cov_tokens) * 1000) // tot.t AS BIGINT) AS oov_permille
FROM cov c, tot
""",
        "scorer_agreement": _TEXT_CTE + f"""
{_RARITY_QNUM_CTES}, uni AS (
  SELECT d.source, q.doc_id, q.qnum, r.rarity_e3,
         ((d.doc_id % {KNUTH_P}) * {KNUTH_A}) % {KNUTH_P} AS h
  FROM qq q JOIN rar r USING (doc_id) JOIN documents d ON q.doc_id = d.doc_id
), keep AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY source ORDER BY h, doc_id) AS srk
    FROM uni
  ) WHERE srk <= {AGREE_K}
), ranked AS (
  SELECT source,
    CAST(row_number() OVER (PARTITION BY source ORDER BY qnum, doc_id) AS BIGINT) AS ra,
    CAST(row_number() OVER (PARTITION BY source ORDER BY rarity_e3, doc_id) AS BIGINT) AS rb
  FROM keep
), agg AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n,
         CAST(sum((ra - rb) * (ra - rb)) AS BIGINT) AS sum_d2
  FROM ranked GROUP BY 1
)
SELECT source, n, sum_d2,
       CAST(1000000 - (6 * sum_d2 * 1000000) // (n * (n * n - 1)) AS BIGINT) AS rho_e6
FROM agg WHERE n >= 2
""",
        "minhash_calibration": f"""
WITH docs AS (
  SELECT doc_id,
         regexp_split_to_array(lower(trim(text)), '[ \\t\\n\\x0B\\f\\r]+') AS w
  FROM documents WHERE trim(text) <> ''
), pairs0 AS (
  SELECT a.doc_id AS doc_a, a.w AS wa, b.w AS wb
  FROM docs a JOIN docs b ON b.doc_id = a.doc_id + 1
  WHERE a.doc_id % {CAL_EVERY} = 0
), pairs AS (
  SELECT doc_a, 'near' AS pair_kind, wa AS ka,
         list_concat(wa, ['extra!']) AS kb FROM pairs0
  UNION ALL
  SELECT doc_a, 'half', wa,
         list_concat(wa[1:(len(wa) + 1) // 2],
                     wb[len(wb) // 2 + 1:]) FROM pairs0
  UNION ALL
  SELECT doc_a, 'far', wa, wb FROM pairs0
), sh AS (
  SELECT doc_a, pair_kind,
    CASE WHEN len(ka) >= 3 THEN list_transform(generate_series(1, len(ka) - 2),
          i -> ka[i] || ' ' || ka[i+1] || ' ' || ka[i+2])
         ELSE [array_to_string(ka, ' ')] END AS sa,
    CASE WHEN len(kb) >= 3 THEN list_transform(generate_series(1, len(kb) - 2),
          i -> kb[i] || ' ' || kb[i+1] || ' ' || kb[i+2])
         ELSE [array_to_string(kb, ' ')] END AS sb
  FROM pairs
), sig AS (
  SELECT doc_a, pair_kind,
    CAST(len(list_distinct(sa)) AS BIGINT) AS n_sh_a,
    CAST(len(list_distinct(sb)) AS BIGINT) AS n_sh_b,
    CAST(len(list_filter(list_distinct(sa),
                         x -> list_contains(sb, x))) AS BIGINT) AS n_inter,
    CAST(len(list_distinct(list_concat(sa, sb))) AS BIGINT) AS n_union,
    CAST(len(list_filter(
      list_transform(generate_series(0, {CAL_PERMS - 1}), k ->
        list_min(list_transform(sa, g ->
          (((('0x' || substr(md5(g), 1, 13))::BIGINT + k * {CAL_STEP})
            % {KNUTH_P}) * {KNUTH_A}) % {KNUTH_P}))
        = list_min(list_transform(sb, g ->
          (((('0x' || substr(md5(g), 1, 13))::BIGINT + k * {CAL_STEP})
            % {KNUTH_P}) * {KNUTH_A}) % {KNUTH_P}))),
      v -> v)) AS BIGINT) AS est_matches
  FROM sh
)
SELECT doc_a, pair_kind, n_sh_a, n_sh_b,
  CAST((n_inter * 100000) // n_union AS BIGINT) AS exact_e5,
  est_matches,
  CAST((est_matches * 100000) // {CAL_PERMS} AS BIGINT) AS est_e5,
  CAST((est_matches * 100000) // {CAL_PERMS}
       - (n_inter * 100000) // n_union AS BIGINT) AS err_e5
FROM sig
""",
        "kn_bigram_score": """
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '[ \\t\\n\\x0B\\f\\r]+') AS t
  FROM documents WHERE trim(text) <> ''
), pairs AS (
  SELECT doc_id, unnest(list_transform(generate_series(1, len(t) - 1),
                                       i -> t[i] || ' ' || t[i+1])) AS bg
  FROM toks
), sp AS (
  SELECT bg, CAST(count(*) AS BIGINT) AS c12,
         split_part(bg, ' ', 1) AS w1, split_part(bg, ' ', 2) AS w2
  FROM pairs GROUP BY 1
), c1 AS (
  SELECT w1, CAST(sum(c12) AS BIGINT) AS c1,
         CAST(count(*) AS BIGINT) AS n1post
  FROM sp GROUP BY 1
), pre AS (
  SELECT w2, CAST(count(*) AS BIGINT) AS n1pre FROM sp GROUP BY 1
), b AS (
  SELECT CAST(count(*) AS BIGINT) AS b FROM sp
), typ AS (
  SELECT sp.bg,
         CAST(floor(ln(
           (CAST(greatest(4 * sp.c12 - 3, 0) AS DOUBLE) * b.b
            + 3.0 * c1.n1post * pre.n1pre)
           / (4.0 * c1.c1 * b.b)
         ) * 1000.0) AS BIGINT) AS lp_e3
  FROM sp JOIN c1 ON sp.w1 = c1.w1 JOIN pre ON sp.w2 = pre.w2, b
), scored AS (
  SELECT p.doc_id, CAST(count(*) AS BIGINT) AS n_pairs,
         CAST(sum(t.lp_e3) AS BIGINT) AS sum_lp_e3
  FROM pairs p JOIN typ t USING (bg) GROUP BY 1
)
SELECT t.doc_id,
       CAST(coalesce(s.n_pairs, 0) AS BIGINT) AS n_pairs,
       s.sum_lp_e3,
       CAST(s.sum_lp_e3 // s.n_pairs AS BIGINT) AS avg_lp_e3
FROM toks t LEFT JOIN scored s USING (doc_id)
""",
        "doc_rarity": """
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '[ \\t\\n\\x0B\\f\\r]+') AS t
  FROM documents WHERE trim(text) <> ''
), inst AS (
  SELECT doc_id, unnest(t) AS tok FROM toks
), dfreq AS (
  SELECT tok, CAST(count(DISTINCT doc_id) AS BIGINT) AS df FROM inst GROUP BY 1
), n AS (
  SELECT CAST(count(*) AS BIGINT) AS n FROM toks
), scored AS (
  SELECT i.doc_id,
         CAST(count(*) AS BIGINT) AS n_toks,
         CAST(sum(CAST(floor(ln(n.n / CAST(d.df AS DOUBLE)) * 1000.0) AS BIGINT)) AS BIGINT) AS sum_idf_e3
  FROM inst i JOIN dfreq d USING (tok), n
  GROUP BY 1
)
SELECT doc_id, n_toks, sum_idf_e3,
       CAST(sum_idf_e3 // n_toks AS BIGINT) AS rarity_e3
FROM scored
""",
        "weighted_sample": _TEXT_CTE + f"""
, q AS (SELECT doc_id, {_QUALITY_SQL} AS quality FROM feats)
, keyed AS (
  SELECT doc_id,
    CAST(floor(quality * 100000 + 0.5) AS BIGINT) + 1 AS w_e5,
    CAST(floor(ln((((doc_id % {KNUTH_P}) * {KNUTH_A}) % {KNUTH_P} + 1)
                  / {float(KNUTH_P + 1)}) * 1000000.0) AS BIGINT) AS lnu_e6
  FROM q
)
SELECT doc_id, w_e5, CAST((lnu_e6 * 100000) // w_e5 AS BIGINT) AS key_e
FROM keyed
ORDER BY key_e DESC, doc_id
LIMIT {WSAMPLE_K}
""",
        "moore_lewis": _moore_lewis_sql(),
        "source_kl": """
WITH toks AS (
  SELECT source, regexp_split_to_array(trim(lower(text)), '[ \\t\\n\\x0B\\f\\r]+') AS t
  FROM documents WHERE trim(text) <> ''
), tok AS (
  SELECT source,
         ((strpos('0123456789abcdef', substr(md5(tk), 1, 1)) - 1) * 16
          + (strpos('0123456789abcdef', substr(md5(tk), 2, 1)) - 1)) % 64 AS bucket
  FROM (SELECT source, unnest(t) AS tk FROM toks)
), counts AS (
  SELECT source, bucket, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY 1, 2
), srcs AS (
  SELECT DISTINCT source FROM counts
), grid AS (
  SELECT s.source, g.b AS bucket FROM srcs s, generate_series(0, 63) g(b)
), sb AS (
  SELECT g.source, g.bucket, coalesce(c.c, 0) AS c
  FROM grid g LEFT JOIN counts c ON g.source = c.source AND g.bucket = c.bucket
), ns AS (
  SELECT source, CAST(sum(c) AS BIGINT) AS n_s FROM sb GROUP BY 1
), qb AS (
  SELECT bucket, CAST(sum(c) AS BIGINT) AS cb FROM sb GROUP BY 1
), nn AS (
  SELECT CAST(sum(c) AS BIGINT) AS n FROM sb
), kl AS (
  SELECT sb.source, CAST(max(ns.n_s) AS BIGINT) AS n_tokens,
    CAST(sum((sb.c + 1) * (
        CAST(floor(ln((sb.c + 1) / (ns.n_s + 64.0)) * 1000.0) AS BIGINT)
      - CAST(floor(ln((qb.cb + 1) / (nn.n + 64.0)) * 1000.0) AS BIGINT)
    )) AS BIGINT) AS kl_ne3
  FROM sb JOIN ns ON sb.source = ns.source
          JOIN qb ON sb.bucket = qb.bucket, nn
  GROUP BY 1
)
SELECT source, n_tokens, kl_ne3,
       CAST(kl_ne3 // (n_tokens + 64) AS BIGINT) AS kl_e3
FROM kl
""",
        "source_jsd": _SOURCE_JSD_SQL,
        "source_geomedian": _source_geomedian_sql(),
        "source_minhash_jaccard": _source_minhash_jaccard_sql(),
        "source_diversity": _SOURCE_DIVERSITY_SQL,
        "vocab_richness": _VOCAB_RICHNESS_SQL,
        "winnow_fingerprints": _winnow_sql(),
        "branching_entropy": _branching_sql(),
        "embedding_anisotropy": _anisotropy_sql(),
        "source_sliced_w1": _sliced_w1_sql(),
        "dawid_skene": _dawid_skene_sql(),
        "confident_learning": _confident_learning_sql(),
        "textrank_keywords": _textrank_sql(),
        "sgns_embeddings": _sgns_sql(),
        "ppmi_svd": _ppmi_svd_sql(),
        "best_snippet": _best_snippet_sql(),
        "texttiling_segments": _texttiling_sql(),
        "source_overlap": f"""
WITH heads AS (
  SELECT DISTINCT source,
    array_to_string(
      regexp_split_to_array(trim(lower(text)), '[ \\t\\n\\x0B\\f\\r]+')[1:{OVERLAP_W}],
      ' ') AS head
  FROM documents WHERE trim(text) <> ''
)
SELECT a.source AS source_a, b.source AS source_b,
       CAST(count(*) AS BIGINT) AS n_shared_heads
FROM heads a JOIN heads b ON a.head = b.head AND a.source < b.source
GROUP BY 1, 2
""",
        "cluster_canonical": """
WITH RECURSIVE docs AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000000, text FROM documents WHERE doc_id % 20 = 0
  UNION ALL
  SELECT doc_id + 2000000000, text || ' extra!' FROM documents WHERE doc_id % 20 = 0
), groups AS (
  SELECT md5(text) AS h, min(doc_id) AS root, count(*) AS n
  FROM docs GROUP BY 1
), exact_pairs AS (
  SELECT g.root AS a, d.doc_id AS b
  FROM docs d JOIN groups g ON md5(d.text) = g.h
  WHERE g.n > 1 AND d.doc_id <> g.root
), nearj AS (
  SELECT doc_id,
    CASE WHEN len(regexp_split_to_array(lower(trim(text)), '[ \\t\\n\\x0B\\f\\r]+')) >= 3
      THEN list_transform(
        generate_series(1, len(regexp_split_to_array(lower(trim(text)), '[ \\t\\n\\x0B\\f\\r]+')) - 2),
        i -> array_to_string(regexp_split_to_array(lower(trim(text)), '[ \\t\\n\\x0B\\f\\r]+')[i:i+2], ' '))
      ELSE [array_to_string(regexp_split_to_array(lower(trim(text)), '[ \\t\\n\\x0B\\f\\r]+'), ' ')]
    END AS sa,
    CASE WHEN len(regexp_split_to_array(lower(trim(text || ' extra!')), '[ \\t\\n\\x0B\\f\\r]+')) >= 3
      THEN list_transform(
        generate_series(1, len(regexp_split_to_array(lower(trim(text || ' extra!')), '[ \\t\\n\\x0B\\f\\r]+')) - 2),
        i -> array_to_string(regexp_split_to_array(lower(trim(text || ' extra!')), '[ \\t\\n\\x0B\\f\\r]+')[i:i+2], ' '))
      ELSE [array_to_string(regexp_split_to_array(lower(trim(text || ' extra!')), '[ \\t\\n\\x0B\\f\\r]+'), ' ')]
    END AS sb
  FROM documents WHERE doc_id % 20 = 0
), near_pairs AS (
  SELECT doc_id AS a, doc_id + 2000000000 AS b
  FROM nearj
  WHERE round(
      len(list_filter(list_distinct(sa), x -> list_contains(sb, x)))::DOUBLE
      / len(list_distinct(list_concat(sa, sb)))::DOUBLE, 5) >= 0.7
), edges AS (
  SELECT a, b FROM exact_pairs UNION SELECT a, b FROM near_pairs
  UNION SELECT b, a FROM exact_pairs UNION SELECT b, a FROM near_pairs
), nodes AS (
  SELECT DISTINCT a AS doc_id FROM edges
), reach(doc_id, label) AS (
  SELECT doc_id, doc_id FROM nodes
  UNION
  SELECT e.a, r.label FROM edges e JOIN reach r ON e.b = r.doc_id
), cc AS (
  SELECT doc_id, min(label) AS cluster_root FROM reach GROUP BY 1
), members AS (
  SELECT c.doc_id, c.cluster_root, length(d.text) AS n_chars
  FROM cc c JOIN docs d USING (doc_id)
), ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY cluster_root ORDER BY n_chars DESC, doc_id) AS rk
  FROM members
), canon AS (
  SELECT cluster_root, doc_id AS canon_id FROM ranked WHERE rk = 1
)
SELECT r.doc_id, r.cluster_root, c.canon_id,
       CAST(r.n_chars AS BIGINT) AS n_chars,
       CAST(r.doc_id = c.canon_id AS BIGINT) AS keep
FROM ranked r JOIN canon c USING (cluster_root)
""",
        "temperature_mix": """
WITH d AS (
  SELECT lang,
         CASE WHEN trim(text) = '' THEN 0
              ELSE len(regexp_split_to_array(trim(text), '[ \\t\\n\\x0B\\f\\r]+')) END AS n_tokens
  FROM documents
), agg AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(n_tokens) AS BIGINT) AS n_tokens
  FROM d GROUP BY 1
), wtd AS (
  SELECT *, CAST(floor(sqrt(CAST(n_tokens AS DOUBLE)) * 1000.0) AS BIGINT) AS w_e3
  FROM agg
), tot AS (
  SELECT CAST(sum(w_e3) AS BIGINT) AS tot_w,
         CAST(sum(n_tokens) AS BIGINT) AS tot_tokens FROM wtd
)
SELECT lang, n_docs, n_tokens, w_e3,
  CAST((w_e3 * 1000000000) // tot_w AS BIGINT) AS share_e9,
  CAST(((w_e3 * 1000000000) // tot_w) * (tot_tokens // 1000000000)
    + (((w_e3 * 1000000000) // tot_w) * (tot_tokens % 1000000000)) // 1000000000
    AS BIGINT) AS alloc_tokens,
  CAST((n_tokens * 1000000000) // tot_tokens AS BIGINT) AS natural_e9
FROM wtd, tot
""",
        "zipf_alpha": f"""
WITH d AS (
  SELECT source, regexp_split_to_array(trim(lower(text)), '[ \\t\\n\\x0B\\f\\r]+') AS t
  FROM documents WHERE trim(text) <> ''
), tok AS (
  SELECT source, unnest(t) AS tok FROM d
), cnt AS (
  SELECT source, tok, CAST(count(*) AS BIGINT) AS cnt FROM tok GROUP BY 1, 2
), top AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (
      PARTITION BY source ORDER BY cnt DESC, tok) AS rk
    FROM cnt)
  WHERE rk <= {ZIPF_TOPK}
), xy AS (
  SELECT source,
    CAST(floor(ln(CAST(rk AS DOUBLE)) * 1000.0) AS BIGINT) AS x,
    CAST(floor(ln(CAST(cnt AS DOUBLE)) * 1000.0) AS BIGINT) AS y
  FROM top
), s AS (
  SELECT source, CAST(count(*) AS BIGINT) AS k,
    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
    CAST(sum(x * y) AS BIGINT) AS sxy, CAST(sum(x * x) AS BIGINT) AS sxx
  FROM xy GROUP BY 1
)
SELECT source, k, sy,
  CAST(((k * sxy - sx * sy) * 1000000) // (k * sxx - sx * sx) AS BIGINT)
    AS slope_e6
FROM s
""",
        "postings_size": f"""
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '[ \\t\\n\\x0B\\f\\r]+') AS t
  FROM documents WHERE trim(text) <> ''
), tok AS (
  SELECT doc_id, unnest(t) AS tok FROM toks
), vc AS (
  SELECT tok FROM (
    SELECT tok, count(*) AS cnt FROM tok
    GROUP BY 1 ORDER BY cnt DESC, tok LIMIT {IDX_TOPK})
), p AS (
  SELECT DISTINCT tok AS term, doc_id FROM tok JOIN vc USING (tok)
), g AS (
  SELECT term,
         doc_id - coalesce(lag(doc_id) OVER (
           PARTITION BY term ORDER BY doc_id), 0) AS gap
  FROM p
)
SELECT term, CAST(count(*) AS BIGINT) AS n_docs,
  CAST(count(*) * 8 AS BIGINT) AS raw_bytes,
  CAST(sum(CASE WHEN gap < 128 THEN 1 WHEN gap < 16384 THEN 2
                WHEN gap < 2097152 THEN 3 WHEN gap < 268435456 THEN 4
                WHEN gap < 34359738368 THEN 5
                WHEN gap < 4398046511104 THEN 6
                WHEN gap < 562949953421312 THEN 7
                WHEN gap < 72057594037927936 THEN 8
                ELSE 9 END) AS BIGINT) AS varint_bytes
FROM g GROUP BY 1
""",
        "text_features": _TEXT_CTE + """
SELECT doc_id, n_chars, n_tokens, round(alpha_ratio, 5) AS alpha_ratio,
  round(greatest(0.0, least(1.0,
    0.4 * alpha_ratio
    + 0.3 * least(n_chars / 500.0, 1.0)
    + 0.3 * (1.0 - least(1.0, 4.0 * punct_ratio + 4.0 * digit_ratio)))), 5)
    AS quality,
  lang_guess
FROM feats
""",
        # t_closeness: the source_ks_drift e9-CDF discipline on the
        # densified QI×bucket grid; ordinal EMD sum DIV (m-1).
        "t_closeness": _TEXT_CTE + f"""
, q0 AS (SELECT doc_id, {_QUALITY_SQL} AS quality FROM feats)
, q AS (
  SELECT d.source, d.lang,
         CAST(d.n_chars // {KANON_LEN_BUCKET} AS BIGINT) AS len_bucket,
         CAST(floor(q0.quality * 100000 + 0.5) AS BIGINT) // 100 AS qb
  FROM q0 JOIN documents d ON q0.doc_id = d.doc_id
)
, hist AS (SELECT source, lang, len_bucket, qb,
                  CAST(count(*) AS BIGINT) AS c
           FROM q GROUP BY 1, 2, 3, 4)
, tot AS (SELECT source, lang, len_bucket,
                 CAST(sum(c) AS BIGINT) AS n_docs
          FROM hist GROUP BY 1, 2, 3)
, gb AS (SELECT qb, CAST(sum(c) AS BIGINT) AS cg FROM hist GROUP BY 1)
, gcdf AS (
  SELECT qb,
         CAST(row_number() OVER (ORDER BY qb) AS BIGINT) AS idx,
         CAST(count(*) OVER () AS BIGINT) AS m,
         CAST((sum(cg) OVER (ORDER BY qb) * 1000000000)
              // sum(cg) OVER () AS BIGINT) AS cdf_g
  FROM gb
)
, grid AS (SELECT t.source, t.lang, t.len_bucket, t.n_docs,
                  g.qb, g.idx, g.m, g.cdf_g
           FROM tot t, gcdf g)
, cum AS (
  SELECT g.source, g.lang, g.len_bucket, g.n_docs, g.qb, g.idx, g.m,
         g.cdf_g,
         CAST(sum(coalesce(h.c, 0)) OVER (
           PARTITION BY g.source, g.lang, g.len_bucket
           ORDER BY g.qb) AS BIGINT) AS cum
  FROM grid g LEFT JOIN hist h
    ON g.source = h.source AND g.lang = h.lang
   AND g.len_bucket = h.len_bucket AND g.qb = h.qb
)
, agg AS (
  SELECT source, lang, len_bucket,
         CAST(max(n_docs) AS BIGINT) AS n_docs,
         CAST(max(m) AS BIGINT) AS m,
         CAST(sum(CASE WHEN idx < m THEN
                    abs((cum * 1000000000) // n_docs - cdf_g)
                  ELSE 0 END) AS BIGINT) AS sum_d
  FROM cum GROUP BY 1, 2, 3
)
SELECT source, lang, len_bucket, n_docs,
       CAST(CASE WHEN m > 1 THEN sum_d // (m - 1) ELSE 0 END AS BIGINT)
         AS emd_e9,
       CASE WHEN (CASE WHEN m > 1 THEN sum_d // (m - 1) ELSE 0 END)
              > {T_CLOSE_E9}
            THEN 'suppress_t' ELSE 'ok' END AS verdict
FROM agg
""",
        "k_anonymity": f"""
WITH qi AS (
  SELECT source, lang,
         CAST(n_chars // {KANON_LEN_BUCKET} AS BIGINT) AS len_bucket,
         (((doc_id % {KNUTH_P}) * {KNUTH_A}) % {KNUTH_P})
           % {KANON_AUTHORS} AS author
  FROM documents
), g AS (
  SELECT source, lang, len_bucket,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(count(DISTINCT author) AS BIGINT) AS n_authors
  FROM qi GROUP BY 1, 2, 3
)
SELECT source, lang, len_bucket, n_docs, n_authors,
       CASE WHEN n_docs < {K_ANON} THEN 'suppress_k'
            WHEN n_authors < {L_DIV} THEN 'suppress_l'
            ELSE 'ok' END AS verdict
FROM g
""",
        "pii_scrub": f"""
WITH pii AS (
  SELECT doc_id,
    CASE WHEN doc_id % 10 = 0
      THEN text || ' Contact user' || doc_id || '@example.com from 10.0.'
           || (doc_id % 250) || '.7 call +12 3456 7890.'
      ELSE text END AS text
  FROM documents
)
SELECT doc_id,
  CAST(len(regexp_extract_all(text, '{_pii_sql()["email"]}')) AS BIGINT) AS n_emails,
  CAST(len(regexp_extract_all(text, '{_pii_sql()["ipv4"]}')) AS BIGINT) AS n_ipv4,
  CAST(len(regexp_extract_all(text, '{_pii_sql()["phone"]}')) AS BIGINT) AS n_phones,
  md5(regexp_replace(regexp_replace(regexp_replace(text,
      '{_pii_sql()["email"]}', '<EMAIL>', 'g'),
      '{_pii_sql()["ipv4"]}', '<IP>', 'g'),
      '{_pii_sql()["phone"]}', '<PHONE>', 'g')) AS scrubbed_md5
FROM pii
""",
        "doc_chunks": """
WITH toks AS (
  SELECT doc_id, regexp_extract_all(text, '\\p{L}+|\\p{N}+|[^\\p{L}\\p{N} \\t\\n\\x0B\\f\\r]+') AS t
  FROM documents
), chunked AS (
  SELECT doc_id,
    list_transform(
      generate_series(1, CAST(ceil(len(t) / 64.0) AS BIGINT)),
      i -> struct_pack(idx := i - 1, c := t[(i-1)*64+1 : (i-1)*64+64])
    ) AS chunks
  FROM toks WHERE len(t) > 0
), ex AS (
  SELECT doc_id, unnest(chunks) AS ch FROM chunked
)
SELECT doc_id,
  CAST(ch.idx AS BIGINT) AS chunk_idx,
  CAST(len(ch.c) AS BIGINT) AS n_tokens,
  md5(array_to_string(ch.c, ' ')) AS chunk_md5
FROM ex
""",
        "repetition": "WITH " + _REP_CTES + """
SELECT b.doc_id, CAST(b.n_words AS BIGINT) AS n_words,
  floor(b.dup_word_frac * 100000 + 0.5) / 100000 AS dup_word_frac,
  floor(coalesce(g2m.top_chars, 0) / CAST(b.n_chars AS DOUBLE)
        * 100000 + 0.5) / 100000 AS top2gram_char_frac,
  floor(coalesce(g3d.dup_chars, 0) / CAST(b.n_chars AS DOUBLE)
        * 100000 + 0.5) / 100000 AS dup3gram_char_frac
FROM base b
LEFT JOIN g2m ON b.doc_id = g2m.doc_id
LEFT JOIN g3d ON b.doc_id = g3d.doc_id
""",
        "sequence_pack": """
WITH d AS (
  SELECT doc_id,
         CASE WHEN trim(text) = '' THEN 0
              ELSE len(regexp_split_to_array(trim(text), '[ \\t\\n\\x0B\\f\\r]+')) END AS n_tokens,
         doc_id % 8 AS shard
  FROM documents
), c AS (
  SELECT doc_id, shard, n_tokens,
         sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                             ROWS UNBOUNDED PRECEDING) AS e
  FROM d WHERE n_tokens > 0
)
SELECT doc_id, CAST(shard AS BIGINT) AS shard,
  CAST(n_tokens AS BIGINT) AS n_tokens,
  CAST((e - n_tokens) // 256 AS BIGINT) AS seq_first,
  CAST((e - 1) // 256 AS BIGINT) AS seq_last,
  CAST((e - 1) // 256 - (e - n_tokens) // 256 + 1 AS BIGINT) AS n_seqs
FROM c
""",
        "packing_efficiency": f"""
WITH n AS (
  SELECT CASE WHEN trim(text) = '' THEN 0
              ELSE CAST(len(regexp_split_to_array(trim(text), '[ \\t\\n\\x0B\\f\\r]+')) AS BIGINT)
         END AS n
  FROM documents
), x AS (
  SELECT g.ctx, n.n
  FROM n CROSS JOIN (SELECT unnest([{", ".join(str(c) for c in PACK_CTX_GRID)}]) AS ctx) g
  WHERE n.n > 0
)
SELECT CAST(ctx AS BIGINT) AS ctx, CAST(count(*) AS BIGINT) AS n_docs,
  CAST(sum(n) AS BIGINT) AS total_tokens,
  CAST(sum((n + ctx - 1) // ctx) AS BIGINT) AS n_seqs_doc_bound,
  CAST(sum(((n + ctx - 1) // ctx) * ctx - n) AS BIGINT) AS pad_doc_bound,
  CAST((sum(n) + ctx - 1) // ctx AS BIGINT) AS n_seqs_concat,
  CAST((ctx - sum(n) % ctx) % ctx AS BIGINT) AS pad_concat
FROM x GROUP BY ctx
""",
        "quality_quantile_gate": _TEXT_CTE + f"""
, q AS (SELECT doc_id, lang, {_QUALITY_SQL} AS quality FROM feats)
, ranked AS (
  SELECT *, percent_rank() OVER (
    PARTITION BY lang ORDER BY quality DESC, doc_id) AS pr
  FROM q
)
SELECT lang, CAST(count(*) AS BIGINT) AS n_kept,
       round(min(quality), 5) AS min_quality,
       round(avg(quality), 5) AS avg_quality
FROM ranked WHERE pr <= 1.0/3.0
GROUP BY 1
""",
        "quality_outliers": _quality_outliers_sql(),
        "source_gini": _source_gini_sql(),
        "script_profile": _script_profile_sql(),
        "psi_drift": _TEXT_CTE + f"""
, q0 AS (SELECT doc_id, {_QUALITY_SQL} AS quality FROM feats)
, q AS (
  SELECT q0.doc_id, d.source, q0.quality
  FROM q0 JOIN documents d ON q0.doc_id = d.doc_id
)
, qbs AS (SELECT source,
                 CAST(floor(quality * 100000 + 0.5) AS BIGINT) // 100 AS qb,
                 (((doc_id % {KNUTH_P}) * {KNUTH_A}) % {KNUTH_P}) % 2 AS sl
          FROM q)
, cnts AS (
  SELECT source, qb,
         CAST(sum(CASE WHEN sl = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c_a,
         CAST(sum(CASE WHEN sl = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c_b
  FROM qbs GROUP BY 1, 2
)
, tot AS (
  SELECT source, CAST(sum(c_a) AS BIGINT) AS n_a,
         CAST(sum(c_b) AS BIGINT) AS n_b,
         CAST(count(*) AS BIGINT) AS n_buckets
  FROM cnts GROUP BY 1
)
, terms AS (
  SELECT c.source, t.n_a, t.n_b, t.n_buckets,
         greatest(((c.c_a + 1) * {PSI_SHARE_SCALE})
                  // (t.n_a + t.n_buckets), 1) AS s_a,
         greatest(((c.c_b + 1) * {PSI_SHARE_SCALE})
                  // (t.n_b + t.n_buckets), 1) AS s_b
  FROM cnts c JOIN tot t USING (source)
)
SELECT source, CAST(max(n_a) AS BIGINT) AS n_a,
       CAST(max(n_b) AS BIGINT) AS n_b,
       CAST(max(n_buckets) AS BIGINT) AS n_buckets,
       CAST(sum((s_a - s_b) *
                CAST(floor(ln(CAST(s_a AS DOUBLE) / CAST(s_b AS DOUBLE))
                           * 1000) AS BIGINT)) AS BIGINT) AS psi_e12
FROM terms GROUP BY 1
""",
        "source_ks_drift": _TEXT_CTE + f"""
, q0 AS (SELECT doc_id, {_QUALITY_SQL} AS quality FROM feats)
, q AS (
  SELECT q0.doc_id, d.source, q0.quality
  FROM q0 JOIN documents d ON q0.doc_id = d.doc_id
)
, qbs AS (SELECT source,
                 CAST(floor(quality * 100000 + 0.5) AS BIGINT) // 100 AS qb
          FROM q)
, hist AS (SELECT source, qb, CAST(count(*) AS BIGINT) AS c
           FROM qbs GROUP BY 1, 2)
, tot AS (SELECT source, CAST(sum(c) AS BIGINT) AS n FROM hist GROUP BY 1)
, bks AS (SELECT DISTINCT qb FROM hist)
, grid AS (SELECT t.source, t.n, b.qb FROM tot t, bks b)
, cum AS (
  SELECT g.source, g.n, g.qb,
         CAST(sum(coalesce(h.c, 0)) OVER (
           PARTITION BY g.source ORDER BY g.qb) AS BIGINT) AS cum
  FROM grid g LEFT JOIN hist h ON g.source = h.source AND g.qb = h.qb
)
, cdf AS (SELECT source, n, qb,
                 CAST((cum * 1000000000) // n AS BIGINT) AS cdf
          FROM cum)
SELECT a.source AS source_a, b.source AS source_b,
       CAST(max(a.n) AS BIGINT) AS n_a,
       CAST(max(b.n) AS BIGINT) AS n_b,
       CAST(max(abs(a.cdf - b.cdf)) AS BIGINT) AS ks_e9
FROM cdf a JOIN cdf b ON a.qb = b.qb AND a.source < b.source
GROUP BY 1, 2
""",
        # source_w1_drift: the source_ks_drift CDF chain verbatim plus
        # the lead-gap bucket table; W1 = sum |dcdf| * gap, all BIGINT.
        "source_w1_drift": _TEXT_CTE + f"""
, q0 AS (SELECT doc_id, {_QUALITY_SQL} AS quality FROM feats)
, q AS (
  SELECT q0.doc_id, d.source, q0.quality
  FROM q0 JOIN documents d ON q0.doc_id = d.doc_id
)
, qbs AS (SELECT source,
                 CAST(floor(quality * 100000 + 0.5) AS BIGINT) // 100 AS qb
          FROM q)
, hist AS (SELECT source, qb, CAST(count(*) AS BIGINT) AS c
           FROM qbs GROUP BY 1, 2)
, tot AS (SELECT source, CAST(sum(c) AS BIGINT) AS n FROM hist GROUP BY 1)
, bks AS (SELECT DISTINCT qb FROM hist)
, nxt AS (SELECT qb, lead(qb) OVER (ORDER BY qb) AS qb_next FROM bks)
, grid AS (SELECT t.source, t.n, b.qb FROM tot t, bks b)
, cum AS (
  SELECT g.source, g.n, g.qb,
         CAST(sum(coalesce(h.c, 0)) OVER (
           PARTITION BY g.source ORDER BY g.qb) AS BIGINT) AS cum
  FROM grid g LEFT JOIN hist h ON g.source = h.source AND g.qb = h.qb
)
, cdf AS (SELECT source, n, qb,
                 CAST((cum * 1000000000) // n AS BIGINT) AS cdf
          FROM cum)
SELECT a.source AS source_a, b.source AS source_b,
       CAST(max(a.n) AS BIGINT) AS n_a,
       CAST(max(b.n) AS BIGINT) AS n_b,
       CAST(sum(abs(a.cdf - b.cdf) * (x.qb_next - x.qb)) AS BIGINT)
         AS w1_e9b
FROM cdf a
JOIN cdf b ON a.qb = b.qb AND a.source < b.source
JOIN nxt x ON a.qb = x.qb
WHERE x.qb_next IS NOT NULL
GROUP BY 1, 2
""",
        "quality_quantile_gate_approx": _TEXT_CTE + f"""
, q AS (SELECT doc_id, lang, {_QUALITY_SQL} AS quality FROM feats)
, qb AS (SELECT *, CAST(floor(quality * 100000 + 0.5) AS BIGINT) // 100 AS qb FROM q)
, hist AS (SELECT lang, qb, CAST(count(*) AS BIGINT) AS c FROM qb GROUP BY 1, 2)
, tot AS (SELECT lang, sum(c) AS n FROM hist GROUP BY 1)
, cum AS (
  SELECT h.lang, h.qb,
         sum(h.c) OVER (PARTITION BY h.lang ORDER BY h.qb DESC) AS cum, t.n
  FROM hist h JOIN tot t USING (lang)
)
, thr AS (
  SELECT lang, max(qb) AS qb_thr FROM cum
  WHERE cum >= (n - 1) // 3 + 1 GROUP BY 1
)
SELECT qb.lang, CAST(count(*) AS BIGINT) AS n_kept,
       round(min(qb.quality), 5) AS min_quality,
       round(avg(qb.quality), 5) AS avg_quality,
       CAST(min(thr.qb_thr) AS BIGINT) AS qb_threshold
FROM qb JOIN thr ON qb.lang = thr.lang AND qb.qb >= thr.qb_thr
GROUP BY 1
""",
        "lm_score": """
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '[ \\t\\n\\x0B\\f\\r]+') AS t
  FROM documents WHERE trim(text) <> ''
), tok AS (
  SELECT doc_id, unnest(t) AS tok FROM toks
), vc AS (
  SELECT tok, CAST(count(*) AS BIGINT) AS cnt FROM tok
  GROUP BY 1 ORDER BY cnt DESC, tok LIMIT 30
), v AS (
  SELECT tok, ln(cnt / (SELECT sum(cnt) FROM vc)::DOUBLE) AS lp FROM vc
), scored AS (
  SELECT tk.doc_id, count(*) AS n_tok, count(v.lp) AS n_in, sum(v.lp) AS s
  FROM tok tk LEFT JOIN v USING (tok)
  GROUP BY 1
)
SELECT doc_id, CAST(n_tok AS BIGINT) AS n_tokens,
  CAST(n_tok - n_in AS BIGINT) AS n_oov,
  CASE WHEN n_in > 0 THEN floor(s / n_in * 1000.0 + 0.5) / 1000.0 END AS avg_logprob
FROM scored
""",
        "dsir_weights": _DSIR_WEIGHTS_CTE + """
SELECT doc_id, lang, CAST(n_tok AS BIGINT) AS n_tokens,
       floor(s / n_tok * 1000.0 + 0.5) / 1000.0 + 0.0 AS dsir_weight
FROM scored
""",
        # the histogram-threshold selection is bit-identical to the
        # global (weight desc, doc_id) top-k (pytest-locked), so the
        # oracle can express it as a plain window rank
        "dsir_topfrac": _DSIR_WEIGHTS_CTE + """
, weights AS (
  SELECT doc_id, lang,
         floor(s / n_tok * 1000.0 + 0.5) / 1000.0 + 0.0 AS dsir_weight
  FROM scored
), ranked AS (
  SELECT doc_id, lang, dsir_weight,
         row_number() OVER (ORDER BY dsir_weight DESC, doc_id) AS rk,
         count(*) OVER () AS n
  FROM weights
)
SELECT doc_id, lang, dsir_weight
FROM ranked
WHERE rk <= greatest(1, CAST(floor(n * 0.5) AS BIGINT))
""",
        "bm25_topk": _bm25_sql(),
        "rrf_fusion": _rrf_fusion_sql(),
        "qlm_topk": _qlm_sql(),
        "pl2_topk": _pl2_sql(),
        "borda_fusion": _borda_fusion_sql(),
        "tfidf_topterms": _tfidf_sql(),
        "bigram_lm_score": _bigram_lm_sql(),
        "stupid_backoff": _stupid_backoff_sql(),
        "source_keyness": _source_keyness_sql(),
        "readability": _readability_sql(),
        "doremi_weights": _doremi_sql(),
        "filter_cascade": _filter_cascade_sql(),
        "source_funnel": _source_funnel_sql(),
        "ngram_novelty": _ngram_novelty_sql(),
        "curriculum_order": _curriculum_sql(),
        "corpus_diff": """
WITH prev AS (
  SELECT doc_id,
         md5(CASE WHEN doc_id % 11 = 0 THEN text || ' v1' ELSE text END) AS h_prev
  FROM documents WHERE doc_id % 7 <> 0
), new AS (
  SELECT doc_id, md5(text) AS h_new
  FROM documents WHERE doc_id % 13 <> 5
)
SELECT CASE WHEN h_prev IS NULL THEN 'added'
            WHEN h_new IS NULL THEN 'removed'
            WHEN h_prev <> h_new THEN 'changed'
            ELSE 'unchanged' END AS status,
       CAST(count(*) AS BIGINT) AS n
FROM prev FULL OUTER JOIN new USING (doc_id)
GROUP BY 1
""",
        "stratified_sample": """
SELECT lang, doc_id, CAST(rk AS BIGINT) AS rk FROM (
  SELECT lang, doc_id,
    row_number() OVER (
      PARTITION BY lang
      ORDER BY ((doc_id % 1000000007) * 2654435761) % 1000000007, doc_id
    ) AS rk
  FROM documents
) WHERE rk <= 20
""",
        "corpus_sample": """
SELECT doc_id, lang,
       ((doc_id % 1000000007) * 2654435761) % 1000000007 AS h,
       md5(text) AS text_md5
FROM documents
ORDER BY h, doc_id
LIMIT 100
""",
        "mixture_sample": """
WITH c AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS n_docs FROM documents GROUP BY 1
), r AS (
  SELECT lang, n_docs,
         sqrt((SELECT min(n_docs) FROM c) / CAST(n_docs AS DOUBLE)) AS rate
  FROM c
), s AS (
  SELECT d.lang, CAST(count(*) AS BIGINT) AS n_sampled
  FROM documents d JOIN r USING (lang)
  WHERE (((d.doc_id % 1000000007) * 2654435761) % 1000000007) < rate * 1000000007.0
  GROUP BY 1
)
SELECT r.lang, r.n_docs, coalesce(s.n_sampled, 0) AS n_sampled,
       round(r.rate, 5) AS rate
FROM r LEFT JOIN s USING (lang)
""",
        "contamination": f"""
WITH ev AS (
  SELECT DISTINCT unnest({_shingles_sql("text")}) AS shingle
  FROM documents WHERE doc_id % 50 = 0
), corpus AS (
  SELECT doc_id, unnest(list_distinct({_shingles_sql("text")})) AS shingle
  FROM documents WHERE doc_id % 50 <> 0
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shared
FROM corpus JOIN ev USING (shingle)
GROUP BY 1
""",
        "lang_confusion": _TEXT_CTE + """
SELECT lang, lang_guess, CAST(count(*) AS BIGINT) AS n
FROM feats GROUP BY 1, 2
""",
        "token_stats": f"""
SELECT doc_id,
  CASE WHEN trim(text) = '' THEN 0
       ELSE CAST(len(regexp_split_to_array(trim(text), '[ \\t\\n\\x0B\\f\\r]+')) AS BIGINT)
  END AS n_tokens_ws,
  CAST(len(regexp_extract_all(text, '\\p{{L}}+|\\p{{N}}+|[^\\p{{L}}\\p{{N}} \\t\\n\\x0B\\f\\r]+'))
       AS BIGINT) AS n_tokens_bpe,
  round(CASE WHEN trim(text) = '' THEN 0.0 ELSE
    len(list_filter(regexp_split_to_array(lower(trim(text)), '[ \\t\\n\\x0B\\f\\r]+'),
                    w -> list_contains({_stopword_list_sql()}, w)))::DOUBLE
    / len(regexp_split_to_array(lower(trim(text)), '[ \\t\\n\\x0B\\f\\r]+'))::DOUBLE
  END, 5) AS stopword_ratio
FROM documents
""",
        "cdc_chunk_dedup": _cdc_sql(),
        "dedup_exact": _DUPS_CTE + """
SELECT md5(text) AS text_md5, CAST(count(*) AS BIGINT) AS n_docs,
       min(doc_id) AS keep_doc_id
FROM docs GROUP BY 1 HAVING count(*) > 1
""",
        "soft_dedup": _DUPS_CTE + """
, g AS (
  SELECT doc_id,
         CASE WHEN trim(text) = '' THEN 0
              ELSE CAST(len(regexp_split_to_array(trim(text), '[ \\t\\n\\x0B\\f\\r]+')) AS BIGINT)
         END AS n_tokens,
         md5(text) AS h
  FROM docs
), w AS (
  SELECT doc_id, n_tokens,
         min(doc_id) OVER (PARTITION BY h) AS group_root,
         CAST(count(*) OVER (PARTITION BY h) AS BIGINT) AS dup_count
  FROM g
)
SELECT doc_id, group_root, dup_count,
       CAST(1000000 // dup_count AS BIGINT) AS weight_e6,
       n_tokens,
       CAST(n_tokens * (1000000 // dup_count) AS BIGINT) AS eff_tokens_e6
FROM w
""",
        "dedup_normalized": _DUPS_CTE + """
SELECT md5(lower(trim(regexp_replace(text, '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g')))) AS norm_md5,
       CAST(count(*) AS BIGINT) AS n_docs, min(doc_id) AS keep_doc_id
FROM docs GROUP BY 1 HAVING count(*) > 1
""",
        "ann_recall_eval": _ann_recall_sql(),
        "ndcg_eval": _ndcg_sql(),
        "map_eval": _map_eval_sql(),
        "rocchio_expand": _rocchio_sql(),
        "matryoshka_eval": _matryoshka_sql(),
        "quantized_recall": _quantized_recall_sql(),
        "bitext_mine": f"""
WITH de AS (
  SELECT d.doc_id, d.lang,
         list_transform(e.embedding, v -> CAST(v AS DOUBLE)) AS emb
  FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
), x AS (
  SELECT doc_id AS x_id, emb AS x_emb FROM de
  WHERE lang = 'en' AND doc_id % {BITEXT_SRC_MOD} = 0
), y AS (
  SELECT doc_id AS y_id, lang AS y_lang, emb AS y_emb FROM de
  WHERE lang <> 'en'
), pairs AS (
  SELECT x_id, y_id, y_lang,
         CAST(floor(list_cosine_similarity(x_emb, y_emb) * 100000)
              AS BIGINT) AS cos_e5
  FROM x, y
), ranked AS (
  SELECT *,
    row_number() OVER (PARTITION BY x_id ORDER BY cos_e5 DESC, y_id) AS rx,
    row_number() OVER (PARTITION BY y_id ORDER BY cos_e5 DESC, x_id) AS ry
  FROM pairs
), ax AS (
  SELECT x_id, CAST(sum(cos_e5) // {BITEXT_K} AS BIGINT) AS ax_e5
  FROM ranked WHERE rx <= {BITEXT_K} GROUP BY 1
), ay AS (
  SELECT y_id, CAST(sum(cos_e5) // {BITEXT_K} AS BIGINT) AS ay_e5
  FROM ranked WHERE ry <= {BITEXT_K} GROUP BY 1
), m AS (
  SELECT p.x_id, p.y_id, p.y_lang, p.cos_e5,
         CAST((2 * p.cos_e5 * 1000000) // (ax_e5 + ay_e5) AS BIGINT)
           AS margin_e6
  FROM pairs p JOIN ax USING (x_id) JOIN ay USING (y_id)
  WHERE ax_e5 + ay_e5 > 0
)
SELECT x_id, y_id, y_lang, cos_e5, margin_e6
FROM (SELECT *, row_number() OVER (
        PARTITION BY x_id ORDER BY margin_e6 DESC, y_id) AS rn
      FROM m)
WHERE rn = 1
""",
        "ann_brute_force": """
WITH q AS (
  SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings WHERE vec_id % 100 = 0
), scored AS (
  SELECT q.q_id, e.vec_id AS neighbor_id,
    CAST(floor(list_cosine_similarity(e.embedding::DOUBLE[], q.q_emb::DOUBLE[])
               * 100000) AS BIGINT) AS sim_e5
  FROM embeddings e, q WHERE e.vec_id <> q.q_id
)
SELECT q_id, neighbor_id, CAST(rn AS BIGINT) AS rank, sim_e5
FROM (SELECT *, row_number() OVER (
        PARTITION BY q_id ORDER BY sim_e5 DESC, neighbor_id) AS rn
      FROM scored)
WHERE rn <= 10
""",
        "kmeans": _kmeans_sql(),
        "kcenter_coreset": _kcenter_sql(),
        "cluster_purity": _cluster_purity_sql(),
        "knn_graph": _knn_graph_sql(),
        "lof_outliers": _lof_sql(),
        "set_simjoin": _set_simjoin_sql(),
        "hard_negatives": _hard_negatives_sql(),
        "knn_components": _knn_components_sql(),
        "triangle_count": _triangle_count_sql(),
        "semantic_dedup": _semantic_dedup_sql(),
        "proto_prune": _proto_prune_sql(),
        "d4_prune": _d4_prune_sql(),
        "mmr_select": _mmr_select_sql(),
        "ccnet_buckets": _ccnet_sql(),
        "exact_substr": _exsub_sql(),
        "pagerank": _pagerank_sql(),
        "unicode_nfc": _unicode_nfc_sql(),
        "inverted_index": _inverted_index_sql(),
        "bloom_dedup": _bloom_dedup_sql(),
        "url_canonicalize": _url_canonicalize_sql(),
        "hits": _hits_sql(),
        "label_propagation": _label_propagation_sql(),
        "graph_modularity": _graph_modularity_sql(),
        "degree_assortativity": _degree_assortativity_sql(),
        "link_predict": _link_predict_sql(),
        "khop_reach": _khop_sql(),
        "kcore": _kcore_sql(),
        "cms_heavy_hitters": _cms_sql(),
        "embedding_pca": _embedding_pca_sql(),
        "shuffle_shards": _shuffle_shards_sql(),
        "token_budget": _token_budget_sql(),
        "unimax_sample": _unimax_sample_sql(),
        "holdout_split": _holdout_split_sql(),
        "lm_eval_holdout": _lm_eval_holdout_sql(),
        "rho_loss_select": _rho_loss_sql(),
        "source_centroid_sim": _source_centroid_sim_sql(),
        "data_scaling_curve": _data_scaling_sql(),
        "logreg_quality": _logreg_sql(),
        "logreg_infer": _logreg_infer_sql(),
        "el2n_prune": _el2n_sql(),
        "grand_prune": _grand_sql(),
        "calibration_bins": _calibration_sql(),
        "brier_decomp": _brier_sql(),
        "conformal_coverage": _conformal_sql(),
        "silhouette": _silhouette_sql(),
        "heaps_law": _heaps_sql(),
        "gradient_align": _gradient_align_sql(),
        "tracin_influence": _tracin_sql(),
        "fim_transform": _fim_sql(),
        "span_corrupt": _span_corrupt_sql(),
        "mlm_transform": _mlm_sql(),
        "nsp_pairs": _nsp_sql(),
        "random_projection": _random_projection_sql(),
        "cka_alignment": _cka_sql(),
        "hamming_codes": _hamming_codes_sql(),
        "quantile_normalize": _quantile_normalize_sql(),
        "best_of_n": _best_of_n_sql(),
        "lsh_bucket_stats": _lsh_bucket_stats_sql(),
        "blocking_quality": _blocking_quality_sql(),
        "dp_noisy_counts": _dp_noisy_counts_sql(),
        "poisson_bootstrap": _poisson_bootstrap_sql(),
        "auc_bootstrap": _auc_bootstrap_sql(),
        "boilerplate_lines": _boilerplate_sql(),
        "hll_distinct": _hll_distinct_sql(),
        "hll_intersect": _hll_intersect_sql(),
        "secret_scan": _secret_scan_sql(),
        "bleu_pairs": _bleu_pairs_sql(),
        "rouge_pairs": _rouge_pairs_sql(),
        "bradley_terry": _bradley_terry_sql(),
        "isotonic_fit": _isotonic_sql(),
        "dbscan_clusters": _dbscan_sql(),
        "cooc_ppmi": _cooc_ppmi_sql(),
        "platt_scaling": _platt_sql(),
        "edit_verify": """
WITH base AS (
  SELECT doc_id, text AS a FROM documents
  WHERE doc_id % 20 = 0 AND trim(text) <> ''
), v AS (
  SELECT doc_id, 'append' AS variant, a, a || ' extra!' AS b FROM base
  UNION ALL
  SELECT doc_id, 'sub', a, regexp_replace(a, 'a', 'b', 'g') FROM base
  UNION ALL
  SELECT doc_id, 'half', a, substring(a, 1, length(a) // 2) FROM base
  UNION ALL
  SELECT doc_id, 'rev', a, reverse(a) FROM base
)
SELECT doc_id, variant,
  CAST(levenshtein(a, b) AS BIGINT) AS d,
  CAST(length(a) AS BIGINT) AS len_a,
  CAST(length(b) AS BIGINT) AS len_b,
  CAST(((greatest(length(a), length(b)) - levenshtein(a, b)) * 100000)
       // greatest(length(a), length(b)) AS BIGINT) AS sim_e5
FROM v
""",
        "split_leakage": f"""
WITH d AS (
  SELECT doc_id, (((doc_id % {KNUTH_P}) * {KNUTH_A}) % {KNUTH_P}) % 1000 AS pm,
         list_distinct({_shingles_sql('text')}) AS sh
  FROM documents WHERE trim(text) <> ''
), ev AS (
  SELECT doc_id,
         CASE WHEN pm >= {HOLDOUT_TEST_FROM} THEN 'test' ELSE 'val' END AS split,
         unnest(sh) AS shingle
  FROM d WHERE pm >= {HOLDOUT_VAL_FROM}
), tr AS (
  SELECT doc_id AS train_doc, unnest(sh) AS shingle
  FROM d WHERE pm < {HOLDOUT_VAL_FROM}
)
SELECT ev.doc_id, ev.split,
       CAST(count(DISTINCT tr.train_doc) AS BIGINT) AS n_train_docs,
       CAST(count(DISTINCT ev.shingle) AS BIGINT) AS n_shared_shingles
FROM ev JOIN tr USING (shingle)
GROUP BY 1, 2
""",
        "roc_auc": _roc_auc_sql(),
        "pr_curve": _pr_curve_sql(),
        "scorer_kappa": _scorer_kappa_sql(),
        "scorer_kendall": _scorer_kendall_sql(),
        "preference_pairs": _preference_pairs_sql(),
        "grad_noise_scale": _grad_noise_sql(),
        "uncertainty_sample": _uncertainty_sql(),
        "cartography": _cartography_sql(),
        "min_k_prob": f"""
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '[ \\t\\n\\x0B\\f\\r]+') AS t
  FROM documents WHERE trim(text) <> ''
), pairs AS (
  SELECT doc_id, list_transform(generate_series(1, len(t) - 1),
                                i -> t[i] || ' ' || t[i+1]) AS g2
  FROM toks
), bg AS (
  SELECT doc_id, unnest(g2) AS bg FROM pairs
), c2 AS (
  SELECT bg, CAST(count(*) AS BIGINT) AS cnt FROM bg
  GROUP BY 1 ORDER BY cnt DESC, bg LIMIT {BIGRAM_VOCAB_K}
), c1 AS (
  SELECT tok, CAST(count(*) AS BIGINT) AS cnt
  FROM (SELECT unnest(t) AS tok FROM toks) GROUP BY 1
), v AS (
  SELECT c2.bg, ln(c2.cnt / CAST(c1.cnt AS DOUBLE)) AS lp
  FROM c2 JOIN c1 ON split_part(c2.bg, ' ', 1) = c1.tok
), d AS (
  SELECT bg.doc_id, count(*) AS n_bg, count(v.lp) AS n_in,
         list_sort(list(v.lp) FILTER (WHERE v.lp IS NOT NULL)) AS lps
  FROM bg LEFT JOIN v USING (bg) GROUP BY 1
), k AS (
  SELECT doc_id, n_bg, n_in, lps,
         CASE WHEN n_in > 0
              THEN (n_in + {MINK_DEN - 1}) // {MINK_DEN} ELSE 0 END AS k_used
  FROM d
)
SELECT t.doc_id,
  CAST(coalesce(k.n_bg, 0) AS BIGINT) AS n_bigrams,
  CAST(coalesce(k.n_in, 0) AS BIGINT) AS n_in,
  CAST(coalesce(k.k_used, 0) AS BIGINT) AS k_used,
  CASE WHEN k.n_in > 0
       THEN floor(list_sum(k.lps[1:k.k_used]) / k.k_used * 1000.0 + 0.5)
            / 1000.0
  END AS mink_score
FROM toks t LEFT JOIN k USING (doc_id)
""",
        "good_turing": """
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '[ \\t\\n\\x0B\\f\\r]+') AS t
  FROM documents WHERE trim(text) <> ''
), pairs AS (
  SELECT doc_id, list_transform(generate_series(1, len(t) - 1),
                                i -> t[i] || ' ' || t[i+1]) AS g2
  FROM toks
), bg AS (
  SELECT doc_id, unnest(g2) AS bg FROM pairs
), c AS (
  SELECT bg, CAST(count(*) AS BIGINT) AS r FROM bg GROUP BY 1
), spec AS (
  SELECT r, CAST(count(*) AS BIGINT) AS n_r FROM c GROUP BY 1
)
SELECT s.r, s.n_r,
       CAST(coalesce(((s.r + 1) * s2.n_r * 1000000) // s.n_r, 0)
            AS BIGINT) AS rstar_e6,
       CAST(s.r * s.n_r AS BIGINT) AS mass
FROM spec s LEFT JOIN spec s2 ON s2.r = s.r + 1
""",
        "collocations_g2": _collocations_g2_sql(),
        "chi2_select": _chi2_select_sql(),
        "source_burrows_delta": _burrows_delta_sql(),
        "token_burstiness": _token_burstiness_sql(),
        "lang_source_cramer": _LANG_SOURCE_CRAMER_SQL,
        "bpe_merges": _bpe_merges_sql(),
        "bpe_encode": _bpe_encode_sql(),
        "tokenizer_fertility": _tokenizer_fertility_sql(),
        "span_dedup": f"""
WITH base AS (
  SELECT doc_id,
         regexp_split_to_array(trim(lower(text)), '[ \\t\\n\\x0B\\f\\r]+') AS t
  FROM documents WHERE trim(text) <> ''
), uni AS (
  SELECT doc_id, t FROM base
  UNION ALL
  SELECT doc_id + {SPAN_DUP_OFFSET}, t FROM base WHERE doc_id % 20 = 0
), ex0 AS (
  SELECT doc_id, t,
         unnest(generate_series(1, CAST(ceil(len(t) / {SPAN_W}.0) AS BIGINT))) AS i
  FROM uni WHERE len(t) > 0
), ex AS (
  SELECT doc_id, i - 1 AS idx,
         array_to_string(t[(i-1)*{SPAN_W} + 1 : (i-1)*{SPAN_W} + {SPAN_W}], ' ') AS span
  FROM ex0
), flagged AS (
  SELECT doc_id, idx, span,
         CASE WHEN row_number() OVER (PARTITION BY span ORDER BY doc_id, idx) = 1
              THEN 1 ELSE 0 END AS kept
  FROM ex
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans,
       CAST(sum(kept) AS BIGINT) AS n_kept,
       CASE WHEN sum(kept) > 0
            THEN md5(string_agg(span, ' ' ORDER BY idx) FILTER (WHERE kept = 1))
       END AS kept_md5
FROM flagged GROUP BY doc_id
""",
        "embedding_quantize": """
WITH e AS (
  SELECT vec_id, label,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
  FROM embeddings
), stats AS (
  SELECT i, min(emb[i]) AS lo, max(emb[i]) AS hi
  FROM e, generate_series(1, 64) t(i)
  GROUP BY i
), coded AS (
  SELECT e.vec_id, e.label, e.emb[t.i] AS x, s.lo, s.hi,
    CASE WHEN s.hi = s.lo THEN -128
         ELSE CAST(round((e.emb[t.i] - s.lo) / (s.hi - s.lo) * 255) - 128
                   AS INTEGER) END AS c
  FROM e, generate_series(1, 64) t(i)
  JOIN stats s ON s.i = t.i
), perrow AS (
  SELECT vec_id, label,
    sum((x - ((c + 128) / 255.0 * (hi - lo) + lo))
        * (x - ((c + 128) / 255.0 * (hi - lo) + lo))) / 64.0 AS mse,
    sum(c) AS code_sum
  FROM coded GROUP BY 1, 2
)
SELECT label, CAST(count(*) AS BIGINT) AS n,
       round(avg(mse), 9) AS avg_mse,
       CAST(sum(code_sum) AS BIGINT) AS code_checksum
FROM perrow GROUP BY 1
""",
        "embedding_stats": """
SELECT label, CAST(count(*) AS BIGINT) AS n,
       round(avg(norm), 5) AS avg_norm,
       round(min(norm), 5) AS min_norm,
       round(max(norm), 5) AS max_norm
FROM (SELECT label,
        sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x))) AS norm
      FROM embeddings)
GROUP BY 1
""",
        "media_counts": _MEDIA_CTE + """
SELECT kind, decode_ok, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(body_bytes) AS BIGINT) AS total_bytes
FROM media GROUP BY 1, 2
""",
        "media_resize": _MEDIA_CTE + """
SELECT doc_id,
  CAST(w AS INTEGER) AS w, CAST(h AS INTEGER) AS h,
  CAST(greatest(1, floor(w * least(32.0 / w, 32.0 / h))) AS INTEGER) AS out_w,
  CAST(greatest(1, floor(h * least(32.0 / w, 32.0 / h))) AS INTEGER) AS out_h,
  CAST(greatest(1, floor(w * least(32.0 / w, 32.0 / h)))
       * greatest(1, floor(h * least(32.0 / w, 32.0 / h))) * ch AS BIGINT)
    AS out_bytes
FROM media WHERE kind = 'image'
""",
        "media_frames": _MEDIA_CTE + """
SELECT CAST(sum((video_frames + 3) // 4) AS BIGINT) AS n_frames,
       CAST(count(*) AS BIGINT) AS n_videos
FROM media WHERE kind = 'video'
""",
        # media_phash: the GROUPING is the PHASH_DUP_MOD/OFF canon
        # formula (operators/multimodal.py — change together); distinct
        # images never collide in the 64-bit hash on the fixed corpus
        # (pytest-locked), so group-by-hash == group-by-canon exactly.
        "media_phash": """
WITH imgs AS (
  SELECT doc_id FROM documents WHERE doc_id % 3 = 0
), canon AS (
  SELECT doc_id,
         CASE WHEN doc_id % 63 = 21 THEN doc_id - 21 ELSE doc_id END AS rep
  FROM imgs
)
SELECT CAST(min(doc_id) AS BIGINT) AS rep_id,
       CAST(count(*) AS BIGINT) AS n_dups
FROM canon GROUP BY rep
""",
        "ngram_jaccard": """
WITH pairs AS (
  SELECT doc_id, text AS text_a, text || ' extra!' AS text_b
  FROM documents WHERE doc_id % 20 = 0
), sh AS (
  SELECT doc_id,
    CASE WHEN len(regexp_split_to_array(lower(trim(text_a)), '[ \\t\\n\\x0B\\f\\r]+')) >= 3
      THEN list_transform(
        generate_series(1, len(regexp_split_to_array(lower(trim(text_a)), '[ \\t\\n\\x0B\\f\\r]+')) - 2),
        i -> array_to_string(regexp_split_to_array(lower(trim(text_a)), '[ \\t\\n\\x0B\\f\\r]+')[i:i+2], ' '))
      ELSE [array_to_string(regexp_split_to_array(lower(trim(text_a)), '[ \\t\\n\\x0B\\f\\r]+'), ' ')]
    END AS sa,
    CASE WHEN len(regexp_split_to_array(lower(trim(text_b)), '[ \\t\\n\\x0B\\f\\r]+')) >= 3
      THEN list_transform(
        generate_series(1, len(regexp_split_to_array(lower(trim(text_b)), '[ \\t\\n\\x0B\\f\\r]+')) - 2),
        i -> array_to_string(regexp_split_to_array(lower(trim(text_b)), '[ \\t\\n\\x0B\\f\\r]+')[i:i+2], ' '))
      ELSE [array_to_string(regexp_split_to_array(lower(trim(text_b)), '[ \\t\\n\\x0B\\f\\r]+'), ' ')]
    END AS sb
  FROM pairs
)
SELECT doc_id,
  round(
    len(list_filter(list_distinct(sa), x -> list_contains(sb, x)))::DOUBLE
    / len(list_distinct(list_concat(sa, sb)))::DOUBLE, 5) AS jaccard_near
FROM sh
""",
        "dedup_embedding": """
WITH emb AS (
  SELECT vec_id, embedding FROM embeddings
  UNION ALL
  SELECT vec_id + 1000000, embedding FROM embeddings WHERE vec_id % 25 = 0
)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
  CAST(floor(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
             * 100000) AS BIGINT) AS sim_e5
FROM emb a, emb b
WHERE a.vec_id < b.vec_id
  AND list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.8
""",
        # Recovery-shaped oracles: signatures aren't SQL-expressible,
        # but the injected pair set + its Jaccard/cosine are pure
        # formulas, and recovery is structurally guaranteed (identical
        # text/embedding → identical signature/buckets).
        "dedup_minhash_lsh": """
WITH near AS (
  SELECT doc_id,
    CASE WHEN len(regexp_split_to_array(lower(trim(text)), '[ \\t\\n\\x0B\\f\\r]+')) >= 3
      THEN list_transform(
        generate_series(1, len(regexp_split_to_array(lower(trim(text)), '[ \\t\\n\\x0B\\f\\r]+')) - 2),
        i -> array_to_string(regexp_split_to_array(lower(trim(text)), '[ \\t\\n\\x0B\\f\\r]+')[i:i+2], ' '))
      ELSE [array_to_string(regexp_split_to_array(lower(trim(text)), '[ \\t\\n\\x0B\\f\\r]+'), ' ')]
    END AS sa,
    CASE WHEN len(regexp_split_to_array(lower(trim(text || ' extra!')), '[ \\t\\n\\x0B\\f\\r]+')) >= 3
      THEN list_transform(
        generate_series(1, len(regexp_split_to_array(lower(trim(text || ' extra!')), '[ \\t\\n\\x0B\\f\\r]+')) - 2),
        i -> array_to_string(regexp_split_to_array(lower(trim(text || ' extra!')), '[ \\t\\n\\x0B\\f\\r]+')[i:i+2], ' '))
      ELSE [array_to_string(regexp_split_to_array(lower(trim(text || ' extra!')), '[ \\t\\n\\x0B\\f\\r]+'), ' ')]
    END AS sb
  FROM documents WHERE doc_id % 20 = 0
), expected AS (
  SELECT doc_id AS doc_a, doc_id + 1000000000 AS doc_b, 1.0 AS jaccard
  FROM documents WHERE doc_id % 20 = 0
  UNION ALL
  SELECT doc_id, doc_id + 2000000000,
    round(
      len(list_filter(list_distinct(sa), x -> list_contains(sb, x)))::DOUBLE
      / len(list_distinct(list_concat(sa, sb)))::DOUBLE, 5)
  FROM near
)
SELECT doc_a, doc_b, jaccard, CAST(1 AS BIGINT) AS recovered
FROM expected WHERE jaccard >= 0.7
""",
        "dedup_simhash": """
SELECT doc_id AS doc_a, doc_id + 1000000000 AS doc_b,
       CAST(0 AS INTEGER) AS hamming
FROM documents WHERE doc_id % 20 = 0
""",
        "dedup_clusters": """
WITH RECURSIVE docs AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000000, text FROM documents WHERE doc_id % 20 = 0
  UNION ALL
  SELECT doc_id + 2000000000, text || ' extra!' FROM documents WHERE doc_id % 20 = 0
), groups AS (
  SELECT md5(text) AS h, min(doc_id) AS root, count(*) AS n
  FROM docs GROUP BY 1
), exact_pairs AS (
  SELECT g.root AS a, d.doc_id AS b
  FROM docs d JOIN groups g ON md5(d.text) = g.h
  WHERE g.n > 1 AND d.doc_id <> g.root
), nearj AS (
  SELECT doc_id,
    CASE WHEN len(regexp_split_to_array(lower(trim(text)), '[ \\t\\n\\x0B\\f\\r]+')) >= 3
      THEN list_transform(
        generate_series(1, len(regexp_split_to_array(lower(trim(text)), '[ \\t\\n\\x0B\\f\\r]+')) - 2),
        i -> array_to_string(regexp_split_to_array(lower(trim(text)), '[ \\t\\n\\x0B\\f\\r]+')[i:i+2], ' '))
      ELSE [array_to_string(regexp_split_to_array(lower(trim(text)), '[ \\t\\n\\x0B\\f\\r]+'), ' ')]
    END AS sa,
    CASE WHEN len(regexp_split_to_array(lower(trim(text || ' extra!')), '[ \\t\\n\\x0B\\f\\r]+')) >= 3
      THEN list_transform(
        generate_series(1, len(regexp_split_to_array(lower(trim(text || ' extra!')), '[ \\t\\n\\x0B\\f\\r]+')) - 2),
        i -> array_to_string(regexp_split_to_array(lower(trim(text || ' extra!')), '[ \\t\\n\\x0B\\f\\r]+')[i:i+2], ' '))
      ELSE [array_to_string(regexp_split_to_array(lower(trim(text || ' extra!')), '[ \\t\\n\\x0B\\f\\r]+'), ' ')]
    END AS sb
  FROM documents WHERE doc_id % 20 = 0
), near_pairs AS (
  SELECT doc_id AS a, doc_id + 2000000000 AS b
  FROM nearj
  WHERE round(
      len(list_filter(list_distinct(sa), x -> list_contains(sb, x)))::DOUBLE
      / len(list_distinct(list_concat(sa, sb)))::DOUBLE, 5) >= 0.7
), edges AS (
  SELECT a, b FROM exact_pairs UNION SELECT a, b FROM near_pairs
  UNION SELECT b, a FROM exact_pairs UNION SELECT b, a FROM near_pairs
), nodes AS (
  SELECT DISTINCT a AS doc_id FROM edges
), reach(doc_id, label) AS (
  SELECT doc_id, doc_id FROM nodes
  UNION
  SELECT e.a, r.label FROM edges e JOIN reach r ON e.b = r.doc_id
), cc AS (
  SELECT doc_id, min(label) AS cluster_root FROM reach GROUP BY 1
), sizes AS (
  SELECT cluster_root, count(*) AS n_cluster FROM cc GROUP BY 1
)
SELECT c.doc_id, c.cluster_root,
       CAST(s.n_cluster AS BIGINT) AS n_cluster,
       CAST(c.doc_id = c.cluster_root AS BIGINT) AS keep
FROM cc c JOIN sizes s USING (cluster_root)
""",
        "training_mix": f"""
WITH RECURSIVE docsx AS (
  SELECT doc_id, text, lang FROM documents
  UNION ALL
  SELECT doc_id + 1000000000, text, lang FROM documents WHERE doc_id % 20 = 0
  UNION ALL
  SELECT doc_id + 2000000000, text || ' extra!', lang FROM documents WHERE doc_id % 20 = 0
), groups AS (
  SELECT md5(text) AS h, min(doc_id) AS root, count(*) AS n
  FROM docsx GROUP BY 1
), exact_pairs AS (
  SELECT g.root AS a, d.doc_id AS b
  FROM docsx d JOIN groups g ON md5(d.text) = g.h
  WHERE g.n > 1 AND d.doc_id <> g.root
), nearj AS (
  SELECT doc_id,
    CASE WHEN len(regexp_split_to_array(lower(trim(text)), '[ \\t\\n\\x0B\\f\\r]+')) >= 3
      THEN list_transform(
        generate_series(1, len(regexp_split_to_array(lower(trim(text)), '[ \\t\\n\\x0B\\f\\r]+')) - 2),
        i -> array_to_string(regexp_split_to_array(lower(trim(text)), '[ \\t\\n\\x0B\\f\\r]+')[i:i+2], ' '))
      ELSE [array_to_string(regexp_split_to_array(lower(trim(text)), '[ \\t\\n\\x0B\\f\\r]+'), ' ')]
    END AS sa,
    CASE WHEN len(regexp_split_to_array(lower(trim(text || ' extra!')), '[ \\t\\n\\x0B\\f\\r]+')) >= 3
      THEN list_transform(
        generate_series(1, len(regexp_split_to_array(lower(trim(text || ' extra!')), '[ \\t\\n\\x0B\\f\\r]+')) - 2),
        i -> array_to_string(regexp_split_to_array(lower(trim(text || ' extra!')), '[ \\t\\n\\x0B\\f\\r]+')[i:i+2], ' '))
      ELSE [array_to_string(regexp_split_to_array(lower(trim(text || ' extra!')), '[ \\t\\n\\x0B\\f\\r]+'), ' ')]
    END AS sb
  FROM documents WHERE doc_id % 20 = 0
), near_pairs AS (
  SELECT doc_id AS a, doc_id + 2000000000 AS b
  FROM nearj
  WHERE round(
      len(list_filter(list_distinct(sa), x -> list_contains(sb, x)))::DOUBLE
      / len(list_distinct(list_concat(sa, sb)))::DOUBLE, 5) >= 0.7
), edges AS (
  SELECT a, b FROM exact_pairs UNION SELECT a, b FROM near_pairs
  UNION SELECT b, a FROM exact_pairs UNION SELECT b, a FROM near_pairs
), nodes AS (
  SELECT DISTINCT a AS doc_id FROM edges
), reach(doc_id, label) AS (
  SELECT doc_id, doc_id FROM nodes
  UNION
  SELECT e.a, r.label FROM edges e JOIN reach r ON e.b = r.doc_id
), cc AS (
  SELECT doc_id, min(label) AS cluster_root FROM reach GROUP BY 1
), corpus AS (
  SELECT d.* FROM docsx d
  WHERE d.doc_id NOT IN (SELECT doc_id FROM cc WHERE doc_id <> cluster_root)
), {_scored_feats_ctes("corpus")}
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
       round(avg(quality), 5) AS avg_quality,
       CAST(sum(CASE WHEN lang_guess = lang THEN 1 ELSE 0 END) AS BIGINT)
         AS n_lang_match
FROM (SELECT *, {_QUALITY_SQL} AS quality FROM feats)
WHERE quality >= 0.3
GROUP BY lang
""",
        "dedup_embedding_lsh": """
SELECT vec_id AS vec_a, vec_id + 1000000 AS vec_b,
  CAST(floor(list_cosine_similarity(embedding::DOUBLE[], embedding::DOUBLE[])
             * 100000) AS BIGINT) AS sim_e5,
  CAST(1 AS BIGINT) AS recovered
FROM embeddings WHERE vec_id % 25 = 0
""",
        "ann_lsh": """
SELECT vec_id AS q_id, vec_id + 1000000 AS copy_id,
  CAST(floor(list_cosine_similarity(embedding::DOUBLE[], embedding::DOUBLE[])
             * 100000) AS BIGINT) AS sim_e5,
  CAST(1 AS BIGINT) AS recovered
FROM embeddings WHERE vec_id % 100 = 0
""",
        "ann_ivf": """
SELECT vec_id AS q_id, vec_id + 1000000 AS copy_id,
  CAST(floor(list_cosine_similarity(embedding::DOUBLE[], embedding::DOUBLE[])
             * 100000) AS BIGINT) AS sim_e5,
  CAST(1 AS BIGINT) AS recovered
FROM embeddings WHERE vec_id % 100 = 0
""",
        "ann_ivf_pq": """
SELECT vec_id AS q_id, vec_id + 1000000 AS copy_id,
  CAST(floor(list_cosine_similarity(embedding::DOUBLE[], embedding::DOUBLE[])
             * 100000) AS BIGINT) AS sim_e5,
  CAST(1 AS BIGINT) AS recovered
FROM embeddings WHERE vec_id % 100 = 0
""",
        # Injected-copy agreement: identical text => identical winnow
        # fingerprint set, so every flag is structurally 1 and the row
        # set is a pure doc_id formula.
        "doc_fingerprints": """
SELECT doc_id AS doc_a, doc_id + 1000000000 AS doc_b,
  CAST(1 AS BIGINT) AS fingerprints_equal,
  CAST(1 AS BIGINT) AS n_fp_equal,
  CAST(1 AS BIGINT) AS has_fp
FROM documents WHERE doc_id % 20 = 0
""",
    }
