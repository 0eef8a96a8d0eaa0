"""spark-submit entry point for the full training-corpus build.

Ships to a cluster as:

  zip -r rxtls_spark.zip rxtls_spark/
  spark-submit --py-files rxtls_spark.zip jobs/run_corpus_build.py \\
      --docs <parquet-path-or-sfdir> --output <run-dir> \\
      [--quality 0.3] [--max-dup3 0.3] [--seq-len 256] [--shards 8]

The one-command version of the pipeline every stage of which is
individually oracle-checked by the driver gate: exact dedup → PII
scrub → quality + repetition gates → temperature-0.5 mixture sample →
per-shard sequence packing stats → scrubbed corpus written
partitioned by lang.  Every stage is pure Catalyst (the scrub is
regexp_replace, the gates are per-row folds, the sample is a
broadcast-rate hash Bernoulli, packing is a per-shard window), so the
same job runs unchanged on a 1000-executor cluster; the summary JSON
records the doc count surviving each stage — no silent drops.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--docs", required=True,
                    help="documents parquet path, or a testdata sf dir")
    ap.add_argument("--output", required=True, help="run directory")
    ap.add_argument("--quality", type=float, default=0.3,
                    help="min quality_score to keep (quality-mode=fixed)")
    ap.add_argument("--quality-mode", choices=("fixed", "quantile"),
                    default="fixed",
                    help="fixed: quality >= --quality; quantile: per-lang "
                    "top-third via the scale-safe histogram gate "
                    "(quality_gate_thresholds — adaptive threshold, no "
                    "per-lang window sort)")
    ap.add_argument("--max-dup3", type=float, default=0.3,
                    help="max repeated-3-gram char fraction to keep")
    ap.add_argument("--gate-mode", choices=("thresholds", "cascade"),
                    default="thresholds",
                    help="thresholds: quality/dup3 floors (see --quality* "
                    "and --max-dup3); cascade: the full filter_cascade "
                    "first-failing-gate funnel (keep verdict=='kept'), "
                    "per-verdict funnel counts recorded in the summary")
    ap.add_argument("--sample-mode", choices=("temperature", "dsir"),
                    default="temperature",
                    help="temperature: sqrt(c_min/c_lang) per-lang rates; "
                    "dsir: keep the top --dsir-frac of gated docs by "
                    "DSIR importance weight toward --dsir-target "
                    "(hashed-unigram log-likelihood ratio)")
    ap.add_argument("--dedup-mode", choices=("drop", "soft"),
                    default="drop",
                    help="drop: keep each exact-dup group's keeper and "
                    "drop the rest; soft: keep EVERY doc and attach a "
                    "SoftDeDup sampling weight weight_e6 = 1e6 DIV "
                    "dup_count of its exact-text group (duplicated text "
                    "stays in the corpus with shrunken gradient mass)")
    ap.add_argument("--outlier-screen", action="store_true",
                    help="after the gates, drop docs whose quality sits "
                    "beyond OUT_Z_E3 (3.5) MADs of their LANGUAGE's "
                    "median (robust_qe_stats — the bounded-histogram "
                    "median/MAD, no per-lang sort); per-lang med/MAD and "
                    "the dropped count are recorded in the summary")
    ap.add_argument("--dsir-target", default="en")
    ap.add_argument("--dsir-frac", type=float, default=0.5)
    ap.add_argument("--seq-len", type=int, default=256)
    ap.add_argument("--shards", type=int, default=8)
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from rxtls_spark.functions.hashing import knuth_hash
    from rxtls_spark.functions.text import (
        lang_guess,
        pii_scrub,
        quality_score,
        repetition_features,
        token_count,
    )
    from rxtls_spark.operators.dedup import exact_dup_groups
    from rxtls_spark.session import get_spark

    spark = get_spark("rxtls-corpus-build", master=args.master)
    spark.sparkContext.setLogLevel("WARN")

    path = args.docs
    if os.path.isdir(path) and os.path.isfile(
        os.path.join(path, "documents.parquet")
    ):
        path = os.path.join(path, "documents.parquet")
    docs = spark.read.parquet(path).select("doc_id", "text", "lang")
    n_docs = docs.count()

    # 1. exact dedup: either keep each group's keeper and drop the
    # rest (drop mode), or keep everything with a SoftDeDup
    # 1/dup_count sampling weight (soft mode — the q_soft_dedup
    # single-shuffle window, no join-back)
    n_soft_weighted = None
    if args.dedup_mode == "soft":
        wdw = Window.partitionBy("h")
        deduped = (
            docs.withColumn("h", F.md5("text"))
            .withColumn(
                "dup_count", F.count(F.lit(1)).over(wdw).cast("long")
            )
            .withColumn(
                "weight_e6",
                F.expr("CAST(1000000 DIV dup_count AS BIGINT)"),
            )
            .drop("h", "dup_count")
            .persist()
        )
        n_deduped = deduped.count()
        n_soft_weighted = deduped.where(
            F.col("weight_e6") < 1_000_000
        ).count()
    else:
        losers = (
            docs.select(F.md5("text").alias("h"), "doc_id")
            .join(
                exact_dup_groups(docs).select(
                    F.col("text_md5").alias("h"),
                    F.col("keep_doc_id").alias("root"),
                ),
                "h",
            )
            .where(F.col("doc_id") != F.col("root"))
            .select("doc_id")
        )
        # persisted: six downstream actions (counts, aggs, the write)
        # would otherwise re-run the dedup join + scrub + fold chain
        deduped = (
            docs.join(losers, "doc_id", "left_anti")
            .withColumn("weight_e6", F.lit(1_000_000).cast("long"))
            .persist()
        )
        n_deduped = deduped.count()

    # 2. PII scrub + 3. quality/repetition gates (single pass — in
    # cascade mode the verdict is one more per-row expression in the
    # SAME projection, so the funnel costs no extra corpus pass)
    r = repetition_features()
    sel = [
        F.col("doc_id"),
        F.col("lang"),
        F.col("weight_e6"),
        pii_scrub().alias("text"),
        quality_score().alias("quality"),
        r["dup3gram_char_frac"].alias("dup3"),
        lang_guess().alias("lang_guess"),
    ]
    if args.gate_mode == "cascade":
        from rxtls_spark.queries_training import cascade_columns

        sel.append(cascade_columns()[0].alias("verdict"))
    feats = deduped.select(*sel)
    quality_thresholds = None
    funnel = None
    if args.gate_mode == "cascade":
        funnel = {
            row["verdict"]: row["n"]
            for row in feats.groupBy("verdict")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        gated = (
            feats.where(F.col("verdict") == "kept").drop("verdict").persist()
        )
        n_gated = gated.count()
        assert sum(funnel.values()) == n_deduped  # funnel partitions docs
        assert funnel.get("kept", 0) == n_gated
    elif args.quality_mode == "quantile":
        from rxtls_spark.queries_training import (
            quality_bucket,
            quality_gate_thresholds,
        )

        quality_thresholds = quality_gate_thresholds(
            feats.select("lang", "quality")
        )
        thr_map = F.create_map(
            *[F.lit(x) for kv in sorted(quality_thresholds.items()) for x in kv]
        )
        qual_ok = quality_bucket() >= thr_map[F.col("lang")]
    else:
        qual_ok = F.col("quality") >= args.quality
    if args.gate_mode != "cascade":
        gated = feats.where(
            qual_ok & (F.col("dup3") <= args.max_dup3)
        ).persist()
        n_gated = gated.count()

    # 3b. optional robust outlier screen: per-lang median/MAD on the
    # exact e5 quality numerators (bounded histogram — the
    # quality_outliers math), drop |z| >= OUT_Z_E3
    n_outlier_dropped = None
    outlier_stats = None
    if args.outlier_screen:
        from rxtls_spark.queries_training import OUT_Z_E3, robust_qe_stats

        qe_col = F.expr("CAST(floor(quality * 100000 + 0.5) AS BIGINT)")
        stats = (
            robust_qe_stats(
                gated.select("lang", qe_col.alias("qe")), "lang"
            )
            .select("lang", "med2_e5", "mad4_e5")
            .distinct()
        )
        outlier_stats = {
            r["lang"]: (r["med2_e5"], r["mad4_e5"])
            for r in stats.collect()
        }
        smap = F.create_map(
            *[
                F.lit(x)
                for lang, (m2, m4) in sorted(outlier_stats.items())
                for x in (lang, f"{m2}:{m4}")
            ]
        )
        parts = F.split(smap[F.col("lang")], ":")
        screened = (
            gated.withColumn("qe", qe_col)
            .withColumn("_m2", F.element_at(parts, 1).cast("long"))
            .withColumn("_m4", F.element_at(parts, 2).cast("long"))
            .where(
                F.expr(
                    "(abs(2 * qe - _m2) * 2000) DIV greatest(_m4, 1L)"
                )
                < OUT_Z_E3
            )
            .drop("qe", "_m2", "_m4")
            .persist()
        )
        n_screened = screened.count()
        n_outlier_dropped = n_gated - n_screened
        gated = screened
        n_gated = n_screened

    # 4. corpus selection: temperature-0.5 mixture sample
    # (deterministic hash Bernoulli) or DSIR importance selection
    # (top-frac by target-domain log-likelihood ratio via the bounded
    # weight-histogram threshold — dsir_select_top_frac; a global
    # orderBy+limit with k ~ half the corpus would merge the top-k on
    # the DRIVER and OOM at 10^12 rows)
    n_dsir_unscoreable = None
    if args.sample_mode == "dsir":
        from rxtls_spark.queries_training import (
            dsir_select_top_frac,
            dsir_weights_for,
        )

        w = dsir_weights_for(
            gated.select("doc_id", "lang", "text"),
            target_lang=args.dsir_target,
        ).persist()
        # the frac is promised over SCOREABLE docs (dsir_weights_for
        # drops trim(text)=='' — unscoreable); empty-text gated docs
        # are counted and reported, never silently vanished
        n_dsir_unscoreable = n_gated - w.count()
        keep_ids = dsir_select_top_frac(w, args.dsir_frac)
        sampled = gated.join(keep_ids, "doc_id")
    else:
        counts = gated.groupBy("lang").agg(F.count(F.lit(1)).alias("c"))
        cmin = counts.agg(F.min("c").alias("cmin"))
        rates = counts.crossJoin(F.broadcast(cmin)).select(
            "lang", F.sqrt(F.col("cmin") / F.col("c")).alias("rate")
        )
        u = knuth_hash(F.col("doc_id"))
        sampled = gated.join(F.broadcast(rates), "lang").where(
            u < F.col("rate") * F.lit(1000000007.0)
        )

    # 5. per-shard packing stats over the surviving token stream
    with_tokens = sampled.withColumn("n_tokens", token_count()).withColumn(
        "shard", (F.col("doc_id") % args.shards).cast("long")
    )
    w = Window.partitionBy("shard").orderBy("doc_id")
    packed = with_tokens.withColumn("cum", F.sum("n_tokens").over(w))
    shard_stats = packed.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.max("cum").alias("n_tokens"),
        F.ceil(F.max("cum") / F.lit(args.seq_len)).alias("n_seqs"),
    )
    lang_rows = (
        sampled.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                (F.col("lang_guess") == F.col("lang")).cast("long")
            ).alias("n_lang_match"),
        )
        .collect()
    )
    per_lang = {row["lang"]: row["n"] for row in lang_rows}
    lang_id_agreement = {
        row["lang"]: row["n_lang_match"] for row in lang_rows
    }
    shards = [row.asDict() for row in shard_stats.orderBy("shard").collect()]

    out_corpus = os.path.join(args.output, "corpus")
    (
        with_tokens.select(
            "doc_id", "lang", "text", "weight_e6", "n_tokens", "shard"
        )
        .repartition(args.shards, "shard")
        .write.mode("overwrite")
        .partitionBy("lang")
        .parquet(out_corpus)
    )

    eff_docs_e6 = with_tokens.agg(
        F.sum("weight_e6").cast("long").alias("s")
    ).collect()[0]["s"]
    summary = {
        "n_docs": n_docs,
        "dedup_mode": args.dedup_mode,
        "n_soft_weighted": n_soft_weighted,
        "eff_docs_e6": eff_docs_e6,
        "n_after_dedup": n_deduped,
        "n_after_gates": n_gated,
        "n_sampled": sum(per_lang.values()),
        "per_lang": per_lang,
        "lang_id_agreement": lang_id_agreement,
        "n_tokens": sum(s["n_tokens"] for s in shards),
        "n_seqs": sum(s["n_seqs"] for s in shards),
        "shards": shards,
        "gate_mode": args.gate_mode,
        "funnel": funnel,
        "quality_mode": args.quality_mode,
        "quality": args.quality,
        "quality_thresholds": quality_thresholds,
        "max_dup3": args.max_dup3,
        "outlier_screen": args.outlier_screen,
        "n_outlier_dropped": n_outlier_dropped,
        "outlier_stats": (
            {
                lang: {"med2_e5": m2, "mad4_e5": m4}
                for lang, (m2, m4) in sorted(outlier_stats.items())
            }
            if outlier_stats is not None
            else None
        ),
        "sample_mode": args.sample_mode,
        "dsir_target": (
            args.dsir_target if args.sample_mode == "dsir" else None
        ),
        "dsir_frac": args.dsir_frac if args.sample_mode == "dsir" else None,
        "n_dsir_unscoreable": n_dsir_unscoreable,
        "seq_len": args.seq_len,
    }
    assert summary["n_sampled"] <= summary["n_after_gates"] <= summary[
        "n_after_dedup"
    ] <= summary["n_docs"]
    os.makedirs(args.output, exist_ok=True)
    with open(os.path.join(args.output, "summary.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary))
    gated.unpersist()
    deduped.unpersist()
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
