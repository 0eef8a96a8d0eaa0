"""Text-analysis operator tests: semantics locked against hand-computed
values; Spark-vs-oracle equivalence is covered by the driver gate
(queries text_features / lang_confusion)."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def tdf(spark):
    rows = [
        (1, "The cat and the dog sat of the mat and slept.", "en"),
        (2, "Der Hund und die Katze und der Vogel.", "de"),
        (3, "Le chat et le chien et les oiseaux.", "fr"),
        (4, "El perro y el gato y de la casa.", "es"),
        (5, "这是一个中文测试文档没有空格", "zh"),
        (6, "", "en"),
        (7, "   ", "en"),
        (8, "12345 67890 !!!", "en"),
        (9, "word", "en"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_lang_guess(spark, tdf):
    from rxtls_spark.functions.text import lang_guess

    got = {
        r["doc_id"]: r["g"]
        for r in tdf.select("doc_id", lang_guess().alias("g")).collect()
    }
    assert got[1] == "en"
    assert got[2] == "de"
    assert got[3] == "fr"
    assert got[4] == "es"
    assert got[5] == "zh"
    assert got[6] == "und"  # empty → no markers
    assert got[8] == "und"  # digits/punct only


def test_token_count(spark, tdf):
    from rxtls_spark.functions.text import token_count

    got = {
        r["doc_id"]: r["n"]
        for r in tdf.select("doc_id", token_count().alias("n")).collect()
    }
    assert got[1] == 11
    assert got[6] == 0
    assert got[7] == 0  # blank-only
    assert got[9] == 1


def test_quality_features_bounds(spark, tdf):
    from rxtls_spark.functions.text import quality_score

    rows = tdf.select(quality_score().alias("q")).collect()
    assert all(0.0 <= r["q"] <= 1.0 for r in rows)


def test_quality_prose_beats_noise(spark, tdf):
    from rxtls_spark.functions.text import quality_score

    got = {
        r["doc_id"]: r["q"]
        for r in tdf.select("doc_id", quality_score().alias("q")).collect()
    }
    assert got[1] > got[8]  # prose > digit noise


def test_pii_scrub_redacts_all_classes(spark):
    from rxtls_spark.functions.text import pii_counts, pii_scrub

    df = spark.createDataFrame(
        [
            (1, "mail me at bob.smith+x@sub.example.org thanks"),
            (2, "server at 192.168.001.42 went down"),
            (3, "call +44 20 7946-0958 now"),
            (4, "clean prose with no contact details at all"),
            (5, "a@b.io and 10.0.0.1 and +12 3456 7890 together"),
        ],
        "doc_id long, text string",
    )
    c = pii_counts()
    rows = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id",
            c["n_emails"].alias("e"),
            c["n_ipv4"].alias("i"),
            c["n_phones"].alias("p"),
            pii_scrub().alias("s"),
        ).collect()
    }
    assert (rows[1]["e"], rows[1]["i"], rows[1]["p"]) == (1, 0, 0)
    assert (rows[2]["e"], rows[2]["i"], rows[2]["p"]) == (0, 1, 0)
    assert (rows[3]["e"], rows[3]["i"], rows[3]["p"]) == (0, 0, 1)
    assert (rows[4]["e"], rows[4]["i"], rows[4]["p"]) == (0, 0, 0)
    assert (rows[5]["e"], rows[5]["i"], rows[5]["p"]) == (1, 1, 1)
    assert rows[1]["s"] == "mail me at <EMAIL> thanks"
    assert rows[2]["s"] == "server at <IP> went down"
    assert rows[3]["s"] == "call <PHONE> now"
    assert rows[4]["s"] == "clean prose with no contact details at all"
    assert rows[5]["s"] == "<EMAIL> and <IP> and <PHONE> together"


def test_contamination_excludes_eval_docs_and_counts_distinct(spark):
    """Eval docs (doc_id%50==0) never appear in the output, and n_shared
    counts DISTINCT shared shingles (repeats in a doc count once)."""
    from pyspark.sql import functions as F

    from rxtls_spark.queries_training import q_contamination
    from tests.conftest import SF_SMOKE

    out = q_contamination(spark, SF_SMOKE)
    rows = out.collect()
    assert rows  # synthetic corpus shares common phrases with eval set
    assert all(r["doc_id"] % 50 != 0 for r in rows)
    assert all(r["n_shared"] >= 1 for r in rows)


def test_doc_chunks_reconstruct_token_stream(spark):
    """Chunk invariants: all chunks but the last hold exactly 64
    tokens, indices are dense from 0, and the per-doc token totals
    match an independent re-tokenization."""
    import re

    from rxtls_spark.queries_training import q_doc_chunks
    from tests.conftest import SF_SMOKE

    rows = q_doc_chunks(spark, SF_SMOKE).collect()
    per_doc = {}
    for r in rows:
        per_doc.setdefault(r["doc_id"], []).append((r["chunk_idx"], r["n_tokens"]))
    docs = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{SF_SMOKE}/documents.parquet").collect()
    }
    # letters | digits | symbol runs — '_' is \w but NOT a letter/digit,
    # so it must land in the symbol class like BPE_PATTERN's does
    pat = re.compile(r"[^\W\d_]+|\d+|(?:[^\w\s]|_)+", re.UNICODE)
    checked = 0
    for doc_id, chunks in list(per_doc.items())[:50]:
        chunks.sort()
        assert [i for i, _ in chunks] == list(range(len(chunks)))
        assert all(n == 64 for _, n in chunks[:-1])
        assert 1 <= chunks[-1][1] <= 64
        n_tokens = sum(n for _, n in chunks)
        # independent tokenizer: \p{L}+|\p{N}+|[^\p{L}\p{N}\s]+ in re syntax
        assert n_tokens == len(pat.findall(docs[doc_id])), doc_id
        checked += 1
    assert checked > 0


def test_repetition_fold_matches_brute_force(spark, tdf):
    """The array_sort + run-length folds must equal a Counter-based
    recomputation of the Gopher fractions, including short/empty docs
    (no 2-gram, no 3-gram, blank, single word)."""
    from collections import Counter

    from rxtls_spark.functions.text import repetition_features

    r = repetition_features()
    got = {
        row["doc_id"]: row
        for row in tdf.select(
            "doc_id",
            "text",
            r["n_words"].alias("n_words"),
            r["dup_word_frac"].alias("dw"),
            r["top2gram_char_frac"].alias("t2"),
            r["dup3gram_char_frac"].alias("d3"),
        ).collect()
    }
    for doc_id, row in got.items():
        words = row["text"].strip().split()
        assert row["n_words"] == len(words), doc_id
        chars = max(len(row["text"]), 1)
        if words:
            exp_dw = 1.0 - len(set(words)) / len(words)
        else:
            exp_dw = 0.0
        g2 = Counter(
            " ".join(words[i : i + 2]) for i in range(len(words) - 1)
        )
        g3 = Counter(
            " ".join(words[i : i + 3]) for i in range(len(words) - 2)
        )
        exp_t2 = max((c * len(g) for g, c in g2.items()), default=0) / chars
        exp_d3 = sum(c * len(g) for g, c in g3.items() if c >= 2) / chars
        assert abs(row["dw"] - exp_dw) < 1e-9, doc_id
        assert abs(row["t2"] - exp_t2) < 1e-9, doc_id
        assert abs(row["d3"] - exp_d3) < 1e-9, doc_id


def test_repetition_flags_degenerate_docs(spark):
    """A boilerplate loop must light up all three fractions; clean
    prose must not."""
    from rxtls_spark.functions.text import repetition_features

    rows = [
        (1, "click here to buy now " * 50),
        (2, "the quick brown fox jumps over a lazy dog near banks"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    r = repetition_features()
    got = {
        x["doc_id"]: x
        for x in df.select(
            "doc_id",
            r["dup_word_frac"].alias("dw"),
            r["top2gram_char_frac"].alias("t2"),
            r["dup3gram_char_frac"].alias("d3"),
        ).collect()
    }
    assert got[1]["dw"] > 0.9 and got[1]["t2"] > 0.2 and got[1]["d3"] > 0.9
    assert got[2]["dw"] == 0.0 and got[2]["d3"] == 0.0


def test_sequence_pack_invariants(spark):
    """Within each shard the packed token stream is gapless: each
    doc's span starts exactly where the previous doc ended, sequence
    ids are the right floor-divisions, and every token lands in
    exactly one sequence."""
    from rxtls_spark.queries_training import q_sequence_pack
    from tests.conftest import SF_SMOKE

    rows = q_sequence_pack(spark, SF_SMOKE).collect()
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r)
    assert len(by_shard) == 8
    for shard, docs in by_shard.items():
        docs.sort(key=lambda r: r["doc_id"])
        offset = 0
        for d in docs:
            assert d["seq_first"] == offset // 256
            end = offset + d["n_tokens"]
            assert d["seq_last"] == (end - 1) // 256
            assert d["n_seqs"] == d["seq_last"] - d["seq_first"] + 1
            offset = end


def test_mixture_sample_rates_and_counts(spark):
    """Rates are sqrt(c_min/c_lang); the rarest language keeps every
    doc (rate 1.0) and every sampled count is reproducible from the
    hash predicate."""
    import math

    from rxtls_spark.queries_training import q_mixture_sample
    from tests.conftest import SF_SMOKE

    rows = {r["lang"]: r for r in q_mixture_sample(spark, SF_SMOKE).collect()}
    cmin = min(r["n_docs"] for r in rows.values())
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").select(
        "doc_id", "lang"
    ).collect()
    for lang, r in rows.items():
        rate = math.sqrt(cmin / r["n_docs"])
        assert abs(r["rate"] - round(rate, 5)) < 1e-12
        exp = sum(
            1
            for d in docs
            if d["lang"] == lang
            and (d["doc_id"] * 2654435761) % 1000000007 < rate * 1000000007.0
        )
        assert r["n_sampled"] == exp, lang
        if r["n_docs"] == cmin:
            assert r["n_sampled"] == r["n_docs"]


def test_quality_quantile_gate_keeps_top_third(spark):
    """Survivors equal a Python recomputation of the per-lang
    percent_rank <= 1/3 cut, and the plan keeps the lang partitioning
    for both the window and the final agg (single exchange)."""
    from rxtls_spark.functions.text import quality_score
    from rxtls_spark.plans.checks import count_exchanges
    from rxtls_spark.queries_training import q_quality_quantile_gate
    from tests.conftest import SF_SMOKE

    df = q_quality_quantile_gate(spark, SF_SMOKE)
    assert count_exchanges(df) == 1
    got = {r["lang"]: r for r in df.collect()}

    scored = (
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .select("doc_id", "lang", quality_score().alias("q"))
        .collect()
    )
    by_lang = {}
    for r in scored:
        by_lang.setdefault(r["lang"], []).append((-r["q"], r["doc_id"], r["q"]))
    for lang, rows in by_lang.items():
        rows.sort()
        n = len(rows)
        kept = [
            q
            for i, (_, _, q) in enumerate(rows)
            if (0.0 if n == 1 else i / (n - 1)) <= 1.0 / 3.0
        ]
        assert got[lang]["n_kept"] == len(kept), lang
        assert abs(got[lang]["min_quality"] - round(min(kept), 5)) < 1e-12


def test_quality_gate_approx_agrees_with_exact(spark):
    """The scale-safe histogram-quantile gate: (a) its plan has NO
    window and a single exchange (the per-lang window sort of the exact
    variant is the thing it removes); (b) the kept-doc set agrees with
    the exact percent_rank anchor on ≥99% of docs per direction, with
    disagreement confined to the threshold bucket."""
    from rxtls_spark.functions.text import quality_score
    from rxtls_spark.plans.checks import count_exchanges, plan_string
    from rxtls_spark.queries_training import (
        q_quality_quantile_gate_approx,
        quality_bucket,
        quality_gate_thresholds,
    )
    from tests.conftest import SF_CORRECT

    df = q_quality_quantile_gate_approx(spark, SF_CORRECT)
    assert count_exchanges(df) == 1
    assert "Window" not in plan_string(df)

    scored_df = (
        spark.read.parquet(f"{SF_CORRECT}/documents.parquet")
        .select("doc_id", "lang", quality_score().alias("quality"))
    )
    thr = quality_gate_thresholds(scored_df)
    approx_kept = {
        r["doc_id"]
        for r in scored_df.select(
            "doc_id", "lang", quality_bucket().alias("qb")
        ).collect()
        if r["qb"] >= thr[r["lang"]]
    }

    by_lang = {}
    for r in scored_df.collect():
        by_lang.setdefault(r["lang"], []).append(
            (-r["quality"], r["doc_id"])
        )
    exact_kept = set()
    for rows in by_lang.values():
        rows.sort()
        n = len(rows)
        exact_kept |= {
            d
            for i, (_, d) in enumerate(rows)
            if (0.0 if n == 1 else i / (n - 1)) <= 1.0 / 3.0
        }
    assert len(exact_kept & approx_kept) >= 0.99 * len(exact_kept)
    assert len(exact_kept & approx_kept) >= 0.99 * len(approx_kept)
    # the gate never keeps fewer than the exact cut (threshold rule
    # covers the exact kept count, boundary-bucket ties only add)
    assert len(approx_kept) >= len(exact_kept)

    # per-lang stats in the query output match the recomputed kept set
    got = {r["lang"]: r for r in df.collect()}
    for lang, t in thr.items():
        assert got[lang]["qb_threshold"] == t


def test_lm_score_broadcast_equals_literal_at_large_vocab(spark, tmp_path):
    """The broadcast-variable scoring path is bit-identical to the
    literal-map path at a production-shaped vocab (10^4 entries), and
    its plan does NOT grow with the vocab (the literal path's does —
    that's why it can't survive 10^5+)."""
    import pandas as pd

    from rxtls_spark.plans.checks import plan_string
    from rxtls_spark.queries_training import q_lm_score, q_lm_score_broadcast

    rows = []
    for d in range(200):
        toks = [f"tok{(d * 61 + j * 7919) % 12000}" for j in range(60)]
        rows.append((d, " ".join(toks), "en"))
    pd.DataFrame(rows, columns=["doc_id", "text", "lang"]).to_parquet(
        tmp_path / "documents.parquet"
    )
    sf = str(tmp_path)

    lit = sorted(
        q_lm_score(spark, sf, vocab_k=10_000).collect(),
        key=lambda r: r["doc_id"],
    )
    bc = sorted(
        q_lm_score_broadcast(spark, sf, vocab_k=10_000).collect(),
        key=lambda r: r["doc_id"],
    )
    assert len(lit) == 200 and len(bc) == 200
    for a, b in zip(lit, bc):
        assert a["doc_id"] == b["doc_id"]
        assert a["n_tokens"] == b["n_tokens"]
        assert a["n_oov"] == b["n_oov"]
        assert a["avg_logprob"] == b["avg_logprob"]

    # bounded plan: vocab 100 → vocab 10^4 leaves the broadcast plan
    # essentially unchanged, while the literal plan carries the map
    p_small = len(plan_string(q_lm_score_broadcast(spark, sf, vocab_k=100)))
    p_big = len(plan_string(q_lm_score_broadcast(spark, sf, vocab_k=10_000)))
    assert p_big < 2 * p_small
    p_lit_big = len(plan_string(q_lm_score(spark, sf, vocab_k=10_000)))
    assert p_lit_big > 10 * p_big


def test_dsir_weights_match_python(spark):
    """Per-doc DSIR importance weights equal a from-scratch Python
    recomputation (hashed-unigram buckets, Laplace smoothing, mean
    log-ratio), the scoring pass is a pure map (0 exchanges, no UDF),
    and target-language docs average a higher weight than the rest
    (the whole point of importance weighting)."""
    import hashlib
    import math

    from rxtls_spark.plans.checks import count_exchanges, plan_string
    from rxtls_spark.queries_training import q_dsir_weights
    from tests.conftest import SF_SMOKE

    df = q_dsir_weights(spark, SF_SMOKE)
    assert count_exchanges(df) == 0
    assert "ArrowEvalPython" not in plan_string(df)
    got = {r["doc_id"]: r for r in df.collect()}

    docs = [
        (r["doc_id"], r["lang"], r["text"])
        for r in spark.read.parquet(f"{SF_SMOKE}/documents.parquet").collect()
        if r["text"].strip()
    ]

    def bucket(tok: str) -> int:
        h = hashlib.md5(tok.encode("utf-8")).hexdigest()
        return (int(h[0], 16) * 16 + int(h[1], 16)) % 64

    raw = [0] * 64
    tgt = [0] * 64
    for _, lang, text in docs:
        for t in text.strip().lower().split():
            b = bucket(t)
            raw[b] += 1
            if lang == "en":
                tgt[b] += 1
    t_raw, t_tgt = sum(raw), sum(tgt)
    lr = [
        math.log((tgt[b] + 1) / (t_tgt + 64))
        - math.log((raw[b] + 1) / (t_raw + 64))
        for b in range(64)
    ]
    by_lang: dict[str, list[float]] = {}
    for doc_id, lang, text in docs:
        toks = text.strip().lower().split()
        w = sum(lr[bucket(t)] for t in toks) / len(toks)
        assert got[doc_id]["n_tokens"] == len(toks)
        assert abs(got[doc_id]["dsir_weight"] - round(w, 3)) <= 1e-3, doc_id
        by_lang.setdefault(lang, []).append(w)
    en = sum(by_lang["en"]) / len(by_lang["en"])
    rest = [w for lang, ws in by_lang.items() if lang != "en" for w in ws]
    assert en > sum(rest) / len(rest)


@pytest.mark.parametrize("frac", [0.1, 0.4, 0.5, 0.9, 1.0])
def test_dsir_select_top_frac_equals_global_topk(spark, frac):
    """The scale-safe histogram-threshold selection must reproduce the
    old global orderBy(desc(weight), doc_id).limit(k) selection
    BIT-FOR-BIT (within a 1e-3 weight bucket all rounded weights are
    equal, so the doc_id-ascending boundary top-up is the same tie
    order), while never merging more than one bucket's rows on the
    driver."""
    from rxtls_spark.queries_training import (
        dsir_select_top_frac,
        dsir_weights_for,
    )
    from tests.conftest import SF_SMOKE

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").select(
        "doc_id", "lang", "text"
    )
    w = dsir_weights_for(docs).persist()
    n = w.count()
    k = max(1, int(n * frac))
    want = {
        r["doc_id"]
        for r in w.orderBy(F.col("dsir_weight").desc(), "doc_id")
        .limit(k)
        .collect()
    }
    got = {r["doc_id"] for r in dsir_select_top_frac(w, frac).collect()}
    w.unpersist()
    assert len(got) == k
    assert got == want


def test_bm25_plan_and_python_recompute(spark):
    """BM25 top-k: the scoring pass is a pure fold ending in
    TakeOrderedAndProject (no Window sort of the corpus, no UDF), and
    the scores equal a from-scratch Python BM25 over the same terms."""
    import math

    from rxtls_spark.plans.checks import plan_string
    from rxtls_spark.queries_training import (
        BM25_B,
        BM25_K1,
        BM25_N_TERMS,
        BM25_TOPK,
        q_bm25_topk,
    )
    from tests.conftest import SF_SMOKE

    df = q_bm25_topk(spark, SF_SMOKE)
    plan = plan_string(df, mode="simple")
    assert "TakeOrderedAndProject" in plan
    assert "ArrowEvalPython" not in plan

    got = df.collect()
    assert len(got) == BM25_TOPK
    assert [r["rank"] for r in got] == list(range(1, BM25_TOPK + 1))

    # from-scratch recompute
    docs = [
        (r["doc_id"], r["text"].strip().lower().split())
        for r in spark.read.parquet(f"{SF_SMOKE}/documents.parquet").collect()
        if r["text"].strip()
    ]
    from collections import Counter

    counts = Counter(t for _, toks in docs for t in toks)
    terms = [
        t for t, _ in sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    ][:BM25_N_TERMS]
    n = len(docs)
    avgdl = sum(len(t) for _, t in docs) / n
    scores = {}
    for doc_id, toks in docs:
        s = 0.0
        for term in terms:
            df_t = sum(1 for _, tt in docs if term in tt)
            idf = math.log((n - df_t + 0.5) / (df_t + 0.5) + 1.0)
            tf = toks.count(term)
            s += idf * (
                (tf * (BM25_K1 + 1.0))
                / (tf + BM25_K1 * (1 - BM25_B + BM25_B * len(toks) / avgdl))
            )
        scores[doc_id] = math.floor(s * 1000.0 + 0.5)
    want = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:BM25_TOPK]
    assert [(r["doc_id"], r["bm25_e3"]) for r in got] == want


def test_corpus_diff_statuses(spark):
    """All four diff classes populated and equal to a Python
    recomputation of the same snapshot derivation."""
    from rxtls_spark.queries_training import q_corpus_diff
    from tests.conftest import SF_SMOKE

    got = {r["status"]: r["n"] for r in q_corpus_diff(spark, SF_SMOKE).collect()}
    docs = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{SF_SMOKE}/documents.parquet").collect()
    }
    prev = {
        d: (t + " v1" if d % 11 == 0 else t)
        for d, t in docs.items()
        if d % 7 != 0
    }
    new = {d: t for d, t in docs.items() if d % 13 != 5}
    exp = {"added": 0, "removed": 0, "changed": 0, "unchanged": 0}
    for d in set(prev) | set(new):
        if d not in prev:
            exp["added"] += 1
        elif d not in new:
            exp["removed"] += 1
        elif prev[d] != new[d]:
            exp["changed"] += 1
        else:
            exp["unchanged"] += 1
    assert got == exp
    assert all(v > 0 for v in exp.values())


def test_lm_score_fold_matches_python(spark):
    """Per-doc OOV counts and average logprob equal a Python
    recomputation of the same top-K unigram model, and the scoring
    stage is a pure map (vocab ships as a literal — 0 exchanges)."""
    import math
    from collections import Counter

    from rxtls_spark.plans.checks import count_exchanges
    from rxtls_spark.queries_training import q_lm_score
    from tests.conftest import SF_SMOKE

    df = q_lm_score(spark, SF_SMOKE)
    assert count_exchanges(df) == 0
    got = {r["doc_id"]: r for r in df.collect()}

    docs = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{SF_SMOKE}/documents.parquet").collect()
        if r["text"].strip()
    }
    cnt = Counter(t for x in docs.values() for t in x.strip().lower().split())
    top = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:30]
    total = sum(c for _, c in top)
    lp = {t: math.log(c / total) for t, c in top}
    n_oov_docs = 0
    for doc_id, text in docs.items():
        toks = text.strip().lower().split()
        in_v = [lp[t] for t in toks if t in lp]
        assert got[doc_id]["n_tokens"] == len(toks)
        assert got[doc_id]["n_oov"] == len(toks) - len(in_v)
        n_oov_docs += got[doc_id]["n_oov"] > 0
        if in_v:
            # engine rounds half-up at 3 dp, Python round is half-even
            # — allow one 3-dp step of slack at exact halves
            assert abs(
                got[doc_id]["avg_logprob"] - round(sum(in_v) / len(in_v), 3)
            ) <= 1e-3
    assert n_oov_docs > 0  # the small vocab exercises the OOV path


def test_text_oracles_agree_on_unicode_and_vt(spark, tmp_path):
    """Adversarial fixture for latent cross-engine divergences the
    ASCII testdata can't catch: CJK (UTF-8 bytes != chars), accented
    words, underscores, em-dash symbols, tab/newline AND vertical-tab
    \\x0B whitespace (Java \\s includes it, RE2's does not).  Runs the
    REAL driver-gate comparison (actual queries + actual oracle SQL)
    on these docs for every text-family oracle."""
    import duckdb
    import pandas as pd

    import sys

    sys.path.insert(0, "/root/repo/tools")
    from check_oracle import normalize_frame

    rows = [
        (1, "你好 世界 你好 世界 你好 世界", "zh"),
        (2, "a_b c\x0bd e—f a_b c\x0bd", "en"),
        (3, "héllo wörld héllo wörld héllo wörld", "de"),
        (4, "tab\tsep\nline end tab\tsep", "en"),
        (5, "plain ascii words only here", "en"),
    ]
    pdf = pd.DataFrame(rows, columns=["doc_id", "text", "lang"])
    pdf["source"] = "t"
    pdf["n_chars"] = pdf["text"].str.len()
    pdf.to_parquet(tmp_path / "documents.parquet")

    from __spark_entry__ import oracle_sql, queries

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet')"
    )
    qs, oracles = queries(), oracle_sql()
    for name in (
        "repetition",
        "doc_chunks",
        "token_stats",
        "text_features",
        "sequence_pack",
        "lm_score",
        "corpus_sample",
        "dedup_normalized",
        "mixture_sample",
        "quality_quantile_gate",
        "quality_quantile_gate_approx",
        "lm_score_broadcast",
        "dsir_weights",
        "corpus_diff",
        "lang_confusion",
        "dedup_exact",
        "ngram_jaccard",
        "pii_scrub",
        "contamination",
        "tfidf_topterms",
        "bigram_lm_score",
        "filter_cascade",
        "curriculum_order",
        "source_funnel",
        "ngram_novelty",
    ):
        s = normalize_frame(qs[name](spark, str(tmp_path)).toPandas())
        o = normalize_frame(con.execute(oracles[name]).fetchdf())
        assert list(s.columns) == list(o.columns), name
        pd.testing.assert_frame_equal(s, o, obj=name)


def test_span_dedup_python_recompute(spark):
    """span_dedup == a from-scratch Python first-occurrence sweep, and
    every injected full copy loses all its spans; plan has no
    cartesian pair enumeration and no UDF."""
    import hashlib

    from rxtls_spark.plans.checks import plan_string
    from rxtls_spark.queries_training import (
        SPAN_DUP_OFFSET,
        SPAN_W,
        q_span_dedup,
    )
    from tests.conftest import SF_SMOKE

    df = q_span_dedup(spark, SF_SMOKE)
    plan = plan_string(df, mode="simple")
    assert "CartesianProduct" not in plan
    assert "ArrowEvalPython" not in plan

    got = {
        r["doc_id"]: (r["n_spans"], r["n_kept"], r["kept_md5"])
        for r in df.collect()
    }

    base = [
        (r["doc_id"], r["text"].strip().lower().split())
        for r in spark.read.parquet(f"{SF_SMOKE}/documents.parquet").collect()
        if r["text"].strip()
    ]
    uni = base + [
        (d + SPAN_DUP_OFFSET, t) for d, t in base if d % 20 == 0
    ]
    rows = []
    for d, toks in uni:
        for i in range(0, (len(toks) + SPAN_W - 1) // SPAN_W):
            rows.append((d, i, " ".join(toks[i * SPAN_W:(i + 1) * SPAN_W])))
    seen = set()
    per_doc = {}
    for d, i, span in sorted(rows):
        ns, nk, kept = per_doc.setdefault(d, [0, 0, []])
        per_doc[d][0] += 1
        if span not in seen:
            seen.add(span)
            per_doc[d][1] += 1
            per_doc[d][2].append(span)
    want = {
        d: (
            ns,
            nk,
            hashlib.md5(" ".join(kept).encode()).hexdigest() if nk else None,
        )
        for d, (ns, nk, kept) in per_doc.items()
    }
    assert got == want
    copies = [d for d in got if d >= SPAN_DUP_OFFSET]
    assert copies
    assert all(got[d][1] == 0 and got[d][2] is None for d in copies)


def test_bpe_apply_merge_is_greedy_left_canonical(spark):
    """The doubled-space replace trick must reproduce canonical BPE
    greedy-left merge application on the adversarial cases: chained
    identical pairs, back-to-back occurrences, substring collisions
    across symbol boundaries ('xa b' must NOT merge as 'a b'), and
    merges touching the </w> marker."""
    from rxtls_spark.queries_training import bpe_apply_merge

    cases = [
        # (syms, left, right, expected)
        ("a a a", "a", "a", "aa a"),
        ("a a a a", "a", "a", "aa aa"),
        ("a b a b", "a", "b", "ab ab"),
        ("x a b y", "a", "b", "x ab y"),
        ("xa b c", "a", "b", "xa b c"),   # 'xa' != 'a': no merge
        ("a bx c", "a", "b", "a bx c"),   # 'bx' != 'b': no merge
        ("t h e </w>", "e", "</w>", "t h e</w>"),
        ("e r e r", "e", "r", "er er"),
        ("a", "a", "a", "a"),             # single symbol: no pairs
        ("ab ab", "ab", "ab", "abab"),    # multi-char symbols merge too
    ]
    df = spark.createDataFrame(
        [(i, s, l, r, e) for i, (s, l, r, e) in enumerate(cases)],
        "i long, syms string, l string, r string, expected string",
    )
    # one expression per distinct (l, r) — evaluate case-by-case
    for i, (s, left, right, expected) in enumerate(cases):
        got = (
            df.where(F.col("i") == i)
            .select(bpe_apply_merge(F.col("syms"), left, right).alias("g"))
            .collect()[0]["g"]
        )
        assert got == expected, (s, left, right, got, expected)
        # Python str.replace shares the scan semantics — the BPE
        # reference recompute below leans on this agreement
        padded = " " + s.replace(" ", "  ") + " "
        py = (
            padded.replace(f" {left}  {right} ", f" {left}{right} ")
            .replace("  ", " ")
            .strip()
        )
        assert py == expected, (s, left, right, py, expected)


def test_bpe_merges_matches_python_reference(spark):
    """Full-loop lock: q_bpe_merges' merge table equals a from-scratch
    Python BPE (Sennrich-style greedy-left, capped word table) run on
    the same corpus — every pair choice, merged symbol and count."""
    import re
    from collections import Counter

    from rxtls_spark.queries_training import (
        BPE_EOW,
        BPE_ITERS,
        BPE_MAX_WORDS,
        q_bpe_merges,
    )
    from tests.conftest import SF_SMOKE

    got = [
        (r["it"], r["pair"], r["merged"], r["total"])
        for r in q_bpe_merges(spark, SF_SMOKE).orderBy("it").collect()
    ]

    texts = [
        r["text"]
        for r in spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .select("text")
        .collect()
    ]
    wc = Counter(w for t in texts for w in re.findall(r"[a-z]+", t))
    top = sorted(wc.items(), key=lambda kv: (-kv[1], kv[0]))[:BPE_MAX_WORDS]
    table = [(" ".join(w) + " " + BPE_EOW, c) for w, c in top]
    expected = []
    for it in range(1, BPE_ITERS + 1):
        pc = Counter()
        for syms, cnt in table:
            toks = syms.split(" ")
            for a, b in zip(toks, toks[1:]):
                pc[a + " " + b] += cnt
        pair, total = sorted(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        left, right = pair.split(" ")
        expected.append((it, pair, left + right, total))
        table = [
            (
                (" " + s.replace(" ", "  ") + " ")
                .replace(f" {left}  {right} ", f" {left}{right} ")
                .replace("  ", " ")
                .strip(),
                c,
            )
            for s, c in table
        ]
    assert got == expected
    # best-pair frequency is non-increasing over merges (new pairs are
    # bounded by the merged pair's count) — the classic BPE invariant
    totals = [t for _, _, _, t in got]
    assert totals == sorted(totals, reverse=True)


def test_logreg_loop_matches_numpy_and_loss_decreases(spark):
    """The GD recurrence (6-dp floor-stable mean gradients, w -= lr*g)
    recomputed in numpy from the collected feature projection must
    reproduce q_logreg_quality's weights exactly, and the pre-update
    mean log-loss must strictly decrease across iterations."""
    import math

    import numpy as np

    from rxtls_spark.queries_training import (
        LOGREG_ITERS,
        LOGREG_LR,
        _docs,
        logreg_features,
        q_logreg_quality,
    )
    from tests.conftest import SF_SMOKE

    out = q_logreg_quality(spark, SF_SMOKE).collect()
    w_got = {(r["it"], r["j"]): r["w"] for r in out}
    loss_got = sorted({r["it"]: r["loss"] for r in out}.items())

    fx = logreg_features(_docs(spark, SF_SMOKE)).toPandas()
    X = np.column_stack(
        [np.ones(len(fx)), fx["x1"], fx["x2"], fx["x3"]]
    ).astype(np.float64)
    y = fx["y"].to_numpy(np.float64)
    n = float(len(fx))
    w = np.zeros(4)
    for it in range(1, LOGREG_ITERS + 1):
        p = 1.0 / (1.0 + np.exp(-(X @ w)))
        g = [
            math.floor(float(np.sum((p - y) * X[:, j])) / n * 1e6 + 0.5)
            / 1e6
            for j in range(4)
        ]
        loss = (
            math.floor(
                float(np.sum(-(y * np.log(p) + (1 - y) * np.log(1 - p))))
                / n
                * 1e6
                + 0.5
            )
            / 1e6
        )
        w = np.array([w[j] - LOGREG_LR * g[j] for j in range(4)])
        for j in range(4):
            # numpy sums pairwise vs Spark's partial-agg order: both
            # land on the same 6-dp-rounded gradient, so weights match
            # to the last bit after the stable round
            assert abs(w_got[(it, j)] - w[j]) < 5e-7, (it, j)
        assert abs(loss_got[it - 1][1] - loss) < 2e-6, it
    losses = [l for _, l in loss_got]
    assert losses == sorted(losses, reverse=True) and len(set(losses)) == len(
        losses
    )


def test_shuffle_shards_is_a_deterministic_permutation(spark):
    """Epoch-shuffle invariants: every doc appears exactly once,
    positions within each shard are contiguous 0..n-1, and the
    assignment is bit-stable across runs (resumable-epoch contract)."""
    from rxtls_spark.queries_training import SHUFFLE_N_SHARDS, q_shuffle_shards
    from tests.conftest import SF_SMOKE

    a = q_shuffle_shards(spark, SF_SMOKE).collect()
    b = q_shuffle_shards(spark, SF_SMOKE).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))

    docs = {r["doc_id"] for r in a}
    assert len(docs) == len(a)
    by_shard = {}
    for r in a:
        assert 0 <= r["shard"] < SHUFFLE_N_SHARDS
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    for shard, ps in by_shard.items():
        assert sorted(ps) == list(range(len(ps))), shard


def test_bpe_encode_roundtrip_and_pure_map_plan(spark):
    """Encoding must be lossless (symbols concatenate back to
    word+</w> for every doc — locks that merges never drop or invent
    characters) and the encode stage must plan as a pure map over the
    docs scan (0 exchanges, no UDF, no join): training happens before
    the plan, the merge table rides as literals."""
    import re

    from rxtls_spark.plans.checks import count_exchanges, plan_string
    from rxtls_spark.queries_training import BPE_EOW, q_bpe_encode
    from tests.conftest import SF_SMOKE

    enc = q_bpe_encode(spark, SF_SMOKE)
    p = plan_string(enc, "simple")
    assert count_exchanges(enc) == 0, p
    assert "ArrowEvalPython" not in p and "Join" not in p, p

    rows = {r["doc_id"]: r for r in enc.collect()}
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").collect()
    # md5 can't be inverted — recompute the encoded stream's skeleton
    # instead: token count bounds and the lossless-chars invariant via
    # chars_per_token * n_bpe_tokens == total az chars (5-dp round)
    for d in docs:
        words = re.findall(r"[a-z]+", d["text"])
        r = rows[d["doc_id"]]
        assert r["n_words"] == len(words)
        if not words:
            assert r["n_bpe_tokens"] == 0 and r["enc_md5"] is None
            continue
        n_chars = sum(len(w) for w in words)
        # each word contributes >= 1 and <= len(word)+1 tokens
        assert len(words) <= r["n_bpe_tokens"] <= n_chars + len(words)
        assert abs(r["chars_per_token"] - n_chars / r["n_bpe_tokens"]) < 1e-5


def test_token_budget_matches_iterative_water_filling(spark):
    """The planner's closed form (prefix-capped strata over the
    cap-sorted order) must equal the classic UniMax iterative
    water-filling loop run with exact rational arithmetic: same capped
    set, same integer allocations.  Also locks the budget-accounting
    invariants: nothing over its cap, budget spent to within one
    floor-share per uncapped stratum, never overspent."""
    from fractions import Fraction

    from rxtls_spark.queries_training import (
        PLAN_MAX_EPOCHS,
        TOKEN_BUDGET_DEN,
        TOKEN_BUDGET_NUM,
        q_token_budget,
    )
    from tests.conftest import SF_SMOKE

    rows = q_token_budget(spark, SF_SMOKE).collect()
    assert rows, "planner returned no strata"
    total = sum(r["avail_tokens"] for r in rows)
    budget = (total * TOKEN_BUDGET_NUM) // TOKEN_BUDGET_DEN

    # iterative reference: peel strata whose cap is under the equal
    # share, re-split the remaining budget, repeat to fixpoint
    caps = {(r["lang"], r["source"]): r["cap_tokens"] for r in rows}
    rem, b = dict(caps), budget
    alloc_ref, capped_ref = {}, set()
    while rem:
        share = Fraction(b, len(rem))
        newly = [k for k, c in rem.items() if c < share]
        if not newly:
            break
        for k in newly:
            alloc_ref[k] = rem.pop(k)
            capped_ref.add(k)
            b -= alloc_ref[k]
    for k, c in rem.items():
        alloc_ref[k] = min(c, b // len(rem))

    spent = 0
    for r in rows:
        k = (r["lang"], r["source"])
        assert r["cap_tokens"] == r["avail_tokens"] * PLAN_MAX_EPOCHS
        assert r["alloc_tokens"] == alloc_ref[k], k
        assert bool(r["capped"]) == (k in capped_ref), k
        assert 0 <= r["alloc_tokens"] <= r["cap_tokens"]
        assert r["epochs"] <= PLAN_MAX_EPOCHS + 1e-9
        got_ep = r["alloc_tokens"] / r["avail_tokens"]
        assert abs(r["epochs"] - got_ep) <= 1e-5
        spent += r["alloc_tokens"]
    n_uncapped = sum(1 for r in rows if not r["capped"])
    assert spent <= budget or n_uncapped == 0
    if n_uncapped:
        # each uncapped stratum floors its share: undershoot < n_uncapped
        assert budget - spent < n_uncapped


def test_proto_prune_matches_sequential_python_replica(spark):
    """Full-table equality with a pure-Python replica that uses the
    centroids from q_kmeans and folds every dot/norm LEFT-TO-RIGHT in
    index order (the Spark aggregate order), so proto_e5, ranks and
    keep decisions must match exactly.  Also locks the per-cell cut:
    exactly floor(n_cell * NUM / DEN) pruned, and every pruned vector
    is >= every kept vector in (proto_e5, -vec_id) order."""
    import math

    import pandas as pd

    from rxtls_spark.queries_training import (
        KMEANS_DIM,
        KMEANS_K,
        PROTO_PRUNE_DEN,
        PROTO_PRUNE_NUM,
        q_kmeans,
        q_proto_prune,
    )
    from tests.conftest import SF_SMOKE

    cents_rows = q_kmeans(spark, SF_SMOKE).collect()
    cents = {}
    for r in cents_rows:
        cents.setdefault(r["cell"], [0.0] * KMEANS_DIM)[r["i"]] = r["m"]
    assert len(cents) == KMEANS_K

    got = {r["vec_id"]: r for r in q_proto_prune(spark, SF_SMOKE).collect()}

    emb = pd.read_parquet(f"{SF_SMOKE}/embeddings.parquet")
    by_cell = {}
    for vec_id, e in zip(emb["vec_id"], emb["embedding"]):
        x = [float(v) for v in e]
        best_cell, best_d = None, None
        for cell in sorted(cents):
            d = 0.0
            for j in range(KMEANS_DIM):  # sequential fold, Spark order
                t = x[j] - cents[cell][j]
                d = d + t * t
            if best_d is None or d < best_d:
                best_cell, best_d = cell, d
        dot = na = nb = 0.0
        for j in range(KMEANS_DIM):
            dot = dot + x[j] * cents[best_cell][j]
            na = na + x[j] * x[j]
            nb = nb + cents[best_cell][j] * cents[best_cell][j]
        sim = dot / (math.sqrt(na) * math.sqrt(nb))
        by_cell.setdefault(best_cell, []).append(
            (math.floor(sim * 100000), int(vec_id))
        )

    n_checked = 0
    for cell, members in by_cell.items():
        members.sort(key=lambda t: (-t[0], t[1]))
        cut = (len(members) * PROTO_PRUNE_NUM) // PROTO_PRUNE_DEN
        for rnk0, (p_e5, vec_id) in enumerate(members):
            g = got[vec_id]
            assert g["cell"] == cell, vec_id
            assert g["proto_e5"] == p_e5, vec_id
            assert g["rnk"] == rnk0 + 1, vec_id
            assert g["kept"] == (1 if rnk0 + 1 > cut else 0), vec_id
            n_checked += 1
        assert sum(1 for p, v in members if not (got[v]["kept"])) == cut
    assert n_checked == len(got) == len(emb)


def test_cms_heavy_hitters_matches_hashlib_sketch(spark):
    """Full replica with Python hashlib: rebuild the D×W sketch from
    the SAME token stream Spark tokenizes (collected, so tokenization
    can't diverge), then check the exact top-k, every estimate's
    min-over-rows value, and the structural CMS guarantee
    est >= exact."""
    import hashlib
    from collections import Counter

    from pyspark.sql import functions as F

    from rxtls_spark.queries_training import (
        CMS_D,
        CMS_TOPK,
        CMS_W,
        _docs,
        _lm_tokens,
        q_cms_heavy_hitters,
    )
    from tests.conftest import SF_SMOKE

    toks = [
        r["tok"]
        for r in _docs(spark, SF_SMOKE)
        .where(F.trim("text") != "")
        .select(F.explode(_lm_tokens()).alias("tok"))
        .collect()
    ]

    def bucket(tok: str, i: int) -> int:
        h = hashlib.md5(f"{tok}#{i}".encode()).hexdigest()
        return int(h[:3], 16) % CMS_W

    sketch = Counter()
    for t in toks:
        for i in range(CMS_D):
            sketch[(i, bucket(t, i))] += 1
    exact = Counter(toks)
    want_topk = sorted(exact.items(), key=lambda kv: (-kv[1], kv[0]))[:CMS_TOPK]

    got = {r["tok"]: r for r in q_cms_heavy_hitters(spark, SF_SMOKE).collect()}
    assert len(got) == CMS_TOPK
    for tok, cnt in want_topk:
        g = got[tok]
        assert g["exact_cnt"] == cnt, tok
        est = min(sketch[(i, bucket(tok, i))] for i in range(CMS_D))
        assert g["cms_est"] == est, tok
        assert g["overcount"] == est - cnt >= 0, tok


def test_holdout_split_membership_is_a_pure_function_of_doc_id(spark):
    """Split assignment must equal the Python replica of the
    knuth-permille rule for every doc (checked via per-group doc
    counts and the xor checksum), the three splits must partition the
    corpus exactly, and the sizes must track the 98/1/1 permille
    thresholds."""
    import pandas as pd

    from rxtls_spark.functions.hashing import KNUTH_A, KNUTH_P
    from rxtls_spark.queries_training import (
        HOLDOUT_TEST_FROM,
        HOLDOUT_VAL_FROM,
        q_holdout_split,
    )
    from tests.conftest import SF_SMOKE

    docs = pd.read_parquet(
        f"{SF_SMOKE}/documents.parquet", columns=["doc_id", "lang"]
    )
    want = {}
    for doc_id, lang in zip(docs["doc_id"], docs["lang"]):
        kh = ((int(doc_id) % KNUTH_P) * KNUTH_A) % KNUTH_P
        pm = kh % 1000
        split = (
            "test"
            if pm >= HOLDOUT_TEST_FROM
            else "val" if pm >= HOLDOUT_VAL_FROM else "train"
        )
        n, x = want.get((split, lang), (0, 0))
        want[(split, lang)] = (n + 1, x ^ kh)

    rows = q_holdout_split(spark, SF_SMOKE).collect()
    got = {(r["split"], r["lang"]): (r["n_docs"], r["id_checksum"]) for r in rows}
    assert got == want
    assert sum(n for n, _ in got.values()) == len(docs)
    n_train = sum(n for (s, _), (n, _x) in got.items() if s == "train")
    assert n_train >= 0.9 * len(docs)  # ~98% at permille thresholds


def test_logreg_infer_scores_with_final_trained_weights(spark):
    """Inference must score every doc with the LAST iteration's
    weights in the exact training fold order: the margin equals the
    Python sequential-fold replica bit-for-bit (after the 5-dp stable
    round), the decision is the margin sign test, and the label column
    matches the training projection."""
    import math

    from rxtls_spark.queries_training import (
        LOGREG_ITERS,
        _docs,
        logreg_features,
        q_logreg_infer,
        q_logreg_quality,
    )
    from tests.conftest import SF_SMOKE

    w = {
        r["j"]: r["w"]
        for r in q_logreg_quality(spark, SF_SMOKE).collect()
        if r["it"] == LOGREG_ITERS
    }
    fx = logreg_features(_docs(spark, SF_SMOKE)).collect()
    inf = {r["doc_id"]: r for r in q_logreg_infer(spark, SF_SMOKE).collect()}
    assert len(inf) == len(fx)
    for r in fx:
        m = w[0] * 1.0 + w[1] * r["x1"] + w[2] * r["x2"] + w[3] * r["x3"]
        g = inf[r["doc_id"]]
        assert g["margin"] == math.floor(m * 1e5 + 0.5) / 1e5, r["doc_id"]
        assert g["pred_en"] == (1 if m >= 0 else 0), r["doc_id"]
        assert g["label"] == int(r["y"]), r["doc_id"]


def test_unimax_sample_consumes_the_token_budget_plan_exactly(spark):
    """The sampler's repeat counts must equal the Python replica built
    from the planner's own output (f = alloc DIV avail full epochs,
    partial epoch by exact-integer hash threshold), every count must
    stay within [f, f+1] and never exceed PLAN_MAX_EPOCHS, and a
    stratum at the full epoch cap must take NO partial members."""
    from rxtls_spark.functions.hashing import KNUTH_A, KNUTH_P
    from rxtls_spark.queries_training import (
        PLAN_MAX_EPOCHS,
        UNIMAX_HASH_MOD,
        q_token_budget,
        q_unimax_sample,
    )
    from tests.conftest import SF_SMOKE

    plan = {}
    for r in q_token_budget(spark, SF_SMOKE).collect():
        avail, alloc = int(r["avail_tokens"]), int(r["alloc_tokens"])
        f = alloc // avail if avail else 0
        thr = (alloc - f * avail) * UNIMAX_HASH_MOD // avail if avail else 0
        plan[(r["lang"], r["source"])] = (f, thr)

    rows = q_unimax_sample(spark, SF_SMOKE).collect()
    assert rows
    per_stratum_extra = {}
    for r in rows:
        f, thr = plan[(r["lang"], r["source"])]
        khm = ((int(r["doc_id"]) % KNUTH_P) * KNUTH_A) % KNUTH_P % UNIMAX_HASH_MOD
        want = f + (1 if khm < thr else 0)
        assert r["n_repeats"] == want, r["doc_id"]
        assert f <= r["n_repeats"] <= min(f + 1, PLAN_MAX_EPOCHS)
        if f == PLAN_MAX_EPOCHS:
            assert r["n_repeats"] == PLAN_MAX_EPOCHS  # capped: no partial
        per_stratum_extra.setdefault((r["lang"], r["source"]), 0)
    # every planned stratum that has documents appears in the output
    langs_sources = {(r["lang"], r["source"]) for r in rows}
    assert langs_sources == set(plan)


def test_filter_cascade_first_failing_gate_and_funnel(spark, tmp_path):
    """The cascade reports the FIRST failing gate in evaluation order
    (a doc that is both repetitive and low-quality reads 'dup_words',
    never 'low_quality'), stage ordinals match the gate order, and the
    verdicts partition the corpus (funnel accounting sums to total)."""
    import pandas as pd

    from rxtls_spark.queries_training import (
        _CASCADE_GATES,
        q_filter_cascade,
    )

    rows = [
        (1, "", "en"),  # empty
        (2, "the cat sat", "en"),  # 3 tokens -> too_short
        (3, "12345 67890 11111 22222 33333", "en"),  # no markers -> und
        (4, "the the the the the the the the", "en"),  # dup words
        # distinct-enough words (dup 2/8=0.25), but 'alpha beta' twice
        # covers >20% of chars -> top2gram; ALSO low quality is true,
        # which must NOT win
        (5, "the quick alpha beta gamma delta alpha beta", "en"),
        # long enough that no single 2-gram covers >20% of chars (the
        # top-2gram metric counts the longest 2-gram even at count 1)
        (
            6,
            "the quick brown fox jumps over a lazy dog while many other "
            "animals watch from nearby green fields today",
            "en",
        ),
    ]
    pdf = pd.DataFrame(rows, columns=["doc_id", "text", "lang"])
    pdf["source"] = "t"
    pdf["n_chars"] = pdf["text"].str.len()
    pdf.to_parquet(tmp_path / "documents.parquet")

    out = {
        r["doc_id"]: (r["verdict"], r["stage"])
        for r in q_filter_cascade(spark, str(tmp_path)).collect()
    }
    assert out[1] == ("empty", 0)
    assert out[2] == ("too_short", 1)
    assert out[3] == ("lang_unknown", 2)
    assert out[4] == ("dup_words", 3)
    assert out[5] == ("top2gram", 4)
    assert out[6] == ("kept", 7)
    # stage ordinal always matches the gate list position
    for verdict, stage in out.values():
        want = (
            _CASCADE_GATES.index(verdict)
            if verdict in _CASCADE_GATES
            else len(_CASCADE_GATES)
        )
        assert stage == want, (verdict, stage)

    # funnel accounting over the real corpus: one verdict per doc
    from tests.conftest import SF_SMOKE

    fc = q_filter_cascade(spark, SF_SMOKE)
    n_docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").count()
    assert fc.count() == n_docs
    assert fc.groupBy("doc_id").count().where("count > 1").count() == 0


def test_bigram_lm_score_matches_python(spark):
    """Independent pure-Python replica of the bigram-LM pipeline
    (tokenize → bigrams → top-K conditional vocab → per-doc average)
    over the real smoke corpus — catches vocab/tie-break/fold bugs the
    DuckDB oracle and Spark could in principle share."""
    import math
    import re

    from rxtls_spark.queries_training import (
        BIGRAM_VOCAB_K,
        q_bigram_lm_score,
    )
    from tests.conftest import SF_SMOKE

    docs = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{SF_SMOKE}/documents.parquet").collect()
    }
    ws = re.compile(r"[ \t\n\x0B\f\r]+")
    toks = {
        d: ws.split(t.strip().lower())
        for d, t in docs.items()
        if t.strip() != ""
    }
    bigrams = {
        d: [f"{t[i]} {t[i + 1]}" for i in range(len(t) - 1)]
        for d, t in toks.items()
    }
    c2: dict[str, int] = {}
    c1: dict[str, int] = {}
    for t in toks.values():
        for w in t:
            c1[w] = c1.get(w, 0) + 1
    for bs in bigrams.values():
        for b in bs:
            c2[b] = c2.get(b, 0) + 1
    top = sorted(c2.items(), key=lambda kv: (-kv[1], kv[0]))[:BIGRAM_VOCAB_K]
    vocab = {b: math.log(c / c1[b.split(" ")[0]]) for b, c in top}

    out = {r["doc_id"]: r for r in q_bigram_lm_score(spark, SF_SMOKE).collect()}
    assert set(out) == set(toks)
    for d, bs in bigrams.items():
        lps = [vocab[b] for b in bs if b in vocab]
        r = out[d]
        assert r["n_bigrams"] == len(bs)
        assert r["n_oov"] == len(bs) - len(lps)
        if lps:
            s = 0.0
            for x in lps:  # sequential fold, Spark's order
                s += x
            want = math.floor(s / len(lps) * 1000.0 + 0.5) / 1000.0
            assert r["avg_logprob"] == want, d
        else:
            assert r["avg_logprob"] is None


def test_curriculum_order_invariants(spark):
    """Stage thresholds hold on the emitted quality, positions are
    dense 0..n-1 within every (stage, shard), and the order key is the
    Knuth hash recomputed in Python."""
    from rxtls_spark.functions.hashing import KNUTH_A, KNUTH_P
    from rxtls_spark.queries_training import (
        CURRICULUM_HI_FROM,
        CURRICULUM_MID_FROM,
        SHUFFLE_N_SHARDS,
        q_curriculum_order,
    )
    from tests.conftest import SF_SMOKE

    rows = q_curriculum_order(spark, SF_SMOKE).collect()
    assert rows
    groups: dict[tuple, list] = {}
    for r in rows:
        qnum = int(r["quality"] * 100000 + 0.5)
        want_stage = (
            0
            if qnum >= CURRICULUM_HI_FROM
            else (1 if qnum >= CURRICULUM_MID_FROM else 2)
        )
        assert r["stage"] == want_stage, r
        key = ((r["doc_id"] % KNUTH_P) * KNUTH_A) % KNUTH_P
        assert r["order_key"] == key
        assert r["shard"] == key % SHUFFLE_N_SHARDS
        groups.setdefault((r["stage"], r["shard"]), []).append(r)
    for g, rs in groups.items():
        rs.sort(key=lambda r: (r["order_key"], r["doc_id"]))
        assert [r["pos"] for r in rs] == list(range(len(rs))), g


def test_tfidf_topterms_matches_python(spark):
    """Independent Python replica of reciprocal-IDF TF-IDF top-k with
    the exact (score desc, term) tie-break over the real smoke corpus."""
    import re

    from rxtls_spark.functions.text import STOPWORDS
    from rxtls_spark.queries_training import TFIDF_TOPK, q_tfidf_topterms
    from tests.conftest import SF_SMOKE

    docs = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{SF_SMOKE}/documents.parquet").collect()
        if r["text"].strip() != ""
    }
    ws = re.compile(r"[ \t\n\x0B\f\r]+")
    stop = set(STOPWORDS)
    tf: dict[tuple, int] = {}
    for d, t in docs.items():
        for w in ws.split(t.strip().lower()):
            if w not in stop:
                tf[(d, w)] = tf.get((d, w), 0) + 1
    df: dict[str, int] = {}
    for (_, w) in tf:
        df[w] = df.get(w, 0) + 1
    n = float(len(docs))
    per_doc: dict[int, list] = {}
    for (d, w), f_ in tf.items():
        per_doc.setdefault(d, []).append((float(f_) * (n / float(df[w])), w, f_))
    want = {}
    for d, terms in per_doc.items():
        terms.sort(key=lambda x: (-x[0], x[1]))
        for rk, (score, w, f_) in enumerate(terms[:TFIDF_TOPK], 1):
            want[(d, w)] = (f_, df[w], score, rk)

    got = q_tfidf_topterms(spark, SF_SMOKE).collect()
    assert len(got) == len(want)
    for r in got:
        k = (r["doc_id"], r["term"])
        assert k in want, k
        f_, dfv, score, rk = want[k]
        assert (r["tf"], r["df"], r["rk"]) == (f_, dfv, rk), k
        assert r["score"] == score, k


def test_source_funnel_accounting(spark):
    """Funnel cells partition each source's docs exactly: per-source n
    sums to the source's doc count, shares are the exact rationals
    n/total, and every verdict agrees with a per-doc cascade join."""
    from rxtls_spark.queries_training import (
        q_filter_cascade,
        q_source_funnel,
    )
    from tests.conftest import SF_SMOKE

    rows = q_source_funnel(spark, SF_SMOKE).collect()
    assert rows
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    per_source = {
        r["source"]: r["n"] for r in docs.groupBy("source").count().withColumnRenamed("count", "n").collect()
    }
    got_totals: dict[str, int] = {}
    for r in rows:
        got_totals[r["source"]] = got_totals.get(r["source"], 0) + r["n"]
        assert r["share"] == r["n"] / per_source[r["source"]]
    assert got_totals == per_source

    # cross-check cell counts against the per-doc cascade
    fc = q_filter_cascade(spark, SF_SMOKE).join(
        docs.select("doc_id", "source"), "doc_id"
    )
    want = {
        (r["source"], r["verdict"]): r["n"]
        for r in fc.groupBy("source", "verdict")
        .count()
        .withColumnRenamed("count", "n")
        .collect()
    }
    assert {(r["source"], r["verdict"]): r["n"] for r in rows} == want


def test_ngram_novelty_matches_python(spark):
    """Pure-Python replica: distinct 5-gram shingles per doc, novelty =
    fraction appearing in no other doc, exact rational doubles."""
    import re

    from rxtls_spark.queries_training import NOVELTY_W, q_ngram_novelty
    from tests.conftest import SF_SMOKE

    ws = re.compile(r"[ \t\n\x0B\f\r]+")
    docs = {
        r["doc_id"]: ws.split(r["text"].strip().lower())
        for r in spark.read.parquet(f"{SF_SMOKE}/documents.parquet").collect()
        if r["text"].strip() != ""
    }
    grams = {
        d: {
            " ".join(t[i : i + NOVELTY_W])
            for i in range(len(t) - NOVELTY_W + 1)
        }
        for d, t in docs.items()
    }
    dfc: dict[str, int] = {}
    for gs in grams.values():
        for g in gs:
            dfc[g] = dfc.get(g, 0) + 1

    out = {r["doc_id"]: r for r in q_ngram_novelty(spark, SF_SMOKE).collect()}
    want_docs = {d for d, gs in grams.items() if gs}
    assert set(out) == want_docs
    for d in want_docs:
        gs = grams[d]
        n_novel = sum(1 for g in gs if dfc[g] == 1)
        r = out[d]
        assert r["n_grams"] == len(gs), d
        assert r["n_novel"] == n_novel, d
        assert r["novelty"] == n_novel / len(gs), d


def test_doremi_weights_eg_invariants(spark):
    """DoReMi (Xie et al. 2023) EG-update invariants: a weight row per
    (source, iter 0..ITERS+1); every iteration is a distribution
    (sums to 1 within the 6-dp floors, all positive); iter 0 is
    uniform; with static per-domain excess the weights are MONOTONE in
    mean excess at every EG step; the final row is the uniform-smoothed
    mix of iter ITERS."""
    from rxtls_spark.queries_training import (
        DOREMI_ITERS,
        DOREMI_SMOOTH_DEN,
        DOREMI_SMOOTH_NUM,
        q_doremi_weights,
    )
    from tests.conftest import SF_SMOKE

    rows = q_doremi_weights(spark, SF_SMOKE).collect()
    by_iter: dict[int, dict[str, object]] = {}
    for r in rows:
        by_iter.setdefault(r["iter"], {})[r["source"]] = r
    d = len(by_iter[0])
    assert d >= 2
    assert sorted(by_iter) == list(range(DOREMI_ITERS + 2))

    for it, per_src in by_iter.items():
        ws = [r["weight"] for r in per_src.values()]
        assert len(ws) == d
        assert abs(sum(ws) - 1.0) < d * 1e-6 + 1e-9
        assert all(x > 0 for x in ws)

    for r in by_iter[0].values():
        assert abs(r["weight"] - 1.0 / d) < 1e-6

    mx = {
        s: r["sum_excess_e3"] / (r["n_docs"] * 1000.0)
        for s, r in by_iter[0].items()
    }
    order = sorted(mx, key=lambda s: (mx[s], s))
    for it in range(1, DOREMI_ITERS + 1):
        ws = [by_iter[it][s]["weight"] for s in order]
        assert ws == sorted(ws), f"EG weights not monotone in excess @it{it}"

    c = DOREMI_SMOOTH_NUM / DOREMI_SMOOTH_DEN
    for s in order:
        w_t = by_iter[DOREMI_ITERS][s]["weight"]
        w_s = by_iter[DOREMI_ITERS + 1][s]["weight"]
        assert abs(w_s - ((1.0 - c) * w_t + c / d)) < 2e-6


def test_exact_substr_matches_position_set_replica(spark):
    """Pure-Python replica with SET-based coverage: the query computes
    duplicated-token coverage via an interval-union fold; the replica
    marks every covered position in an explicit set — agreement proves
    the interval arithmetic.  Also: full injected copies leave their
    original 100%-covered; half copies cover exactly the first
    (n+1)//2 tokens of the original minus the k-gram boundary effect;
    no cartesian in the plan."""
    import re
    from collections import Counter

    from rxtls_spark.plans.checks import plan_string
    from rxtls_spark.queries_training import (
        EXSUB_HALF_OFFSET,
        EXSUB_K,
        SPAN_DUP_OFFSET,
        q_exact_substr,
    )
    from tests.conftest import SF_SMOKE

    df = q_exact_substr(spark, SF_SMOKE)
    plan = plan_string(df, mode="simple")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan

    ws = re.compile(r"[ \t\n\x0B\f\r]+")
    base = {
        r["doc_id"]: ws.split(r["text"].strip().lower())
        for r in spark.read.parquet(f"{SF_SMOKE}/documents.parquet").collect()
        if r["text"].strip() != ""
    }
    uni = dict(base)
    for d, t in base.items():
        if d % 20 == 0:
            uni[d + SPAN_DUP_OFFSET] = t
        if d % 16 == 3:
            uni[d + EXSUB_HALF_OFFSET] = t[: (len(t) + 1) // 2]

    k = EXSUB_K
    occ = Counter(
        " ".join(t[i : i + k])
        for t in uni.values()
        for i in range(len(t) - k + 1)
    )
    got = {r["doc_id"]: r for r in df.collect()}
    assert set(got) == set(uni)
    for d, t in uni.items():
        n = len(t)
        starts = [
            i
            for i in range(n - k + 1)
            if occ[" ".join(t[i : i + k])] >= 2
        ]
        covered = set()
        for i in starts:
            covered.update(range(i, i + k))
        r = got[d]
        assert r["n_tokens"] == n, d
        assert r["n_grams"] == max(0, n - k + 1), d
        assert r["n_dup_grams"] == len(starts), d
        assert r["n_dup_tokens"] == len(covered), d

    full_originals = [d for d in base if d % 20 == 0 and len(base[d]) >= k]
    assert full_originals
    for d in full_originals:
        assert got[d]["n_dup_tokens"] == got[d]["n_tokens"], d


def test_ccnet_buckets_tercile_rule(spark):
    """CCNet bucketing invariants, recomputed from the query's own
    (lang, lp_e3) pairs: with cum(v) = #docs scoring >= v, head is
    exactly lp_e3 >= t1 = max{v : cum(v) >= ceil(n/3)} and middle is
    t2 <= lp_e3 < t1 — ties never straddle a bucket boundary; the
    scoreable set equals lm_score's non-null rows; per-lang head
    count >= ceil(n/3) and head+middle >= ceil(2n/3)."""
    from collections import defaultdict

    from rxtls_spark.queries_training import q_ccnet_buckets, q_lm_score
    from tests.conftest import SF_SMOKE

    rows = q_ccnet_buckets(spark, SF_SMOKE).collect()
    scoreable = {
        r["doc_id"]
        for r in q_lm_score(spark, SF_SMOKE).collect()
        if r["avg_logprob"] is not None
    }
    assert {r["doc_id"] for r in rows} == scoreable

    by_lang = defaultdict(list)
    for r in rows:
        by_lang[r["lang"]].append(r)
    assert len(by_lang) >= 2
    for lang, rs in by_lang.items():
        n = len(rs)
        vals = sorted((r["lp_e3"] for r in rs), reverse=True)
        cut1, cut2 = (n + 2) // 3, (2 * n + 2) // 3
        t1, t2 = vals[cut1 - 1], vals[cut2 - 1]
        n_head = n_mid = 0
        for r in rs:
            want = (
                "head"
                if r["lp_e3"] >= t1
                else "middle"
                if r["lp_e3"] >= t2
                else "tail"
            )
            assert r["bucket"] == want, (lang, r)
            n_head += want == "head"
            n_mid += want == "middle"
        assert n_head >= cut1, lang
        assert n_head + n_mid >= cut2, lang
        # same score -> same bucket (ties cannot straddle)
        seen: dict[int, str] = {}
        for r in rs:
            assert seen.setdefault(r["lp_e3"], r["bucket"]) == r["bucket"]


def test_unicode_nfc_matches_python_replica(spark):
    """Exact-equality replica via unicodedata + hashlib: every output
    column (char counts, changed flag, md5 of the NFC text) matches a
    pure-Python recompute; injected docs (doc_id%7==2) lose exactly
    the two combining marks and flag changed=1; the UDF is planned
    ONCE (ArrowEvalPython==1 — the parse-UDF invariant)."""
    import hashlib
    import unicodedata

    from rxtls_spark.plans.checks import plan_string
    from rxtls_spark.queries_training import NFC_SUFFIX, q_unicode_nfc
    from tests.conftest import SF_SMOKE

    df = q_unicode_nfc(spark, SF_SMOKE)
    plan = plan_string(df, mode="simple")
    assert plan.count("ArrowEvalPython") == 1

    docs = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(
            f"{SF_SMOKE}/documents.parquet"
        ).collect()
    }
    got = {r["doc_id"]: r for r in df.collect()}
    assert set(got) == set(docs)
    n_injected = 0
    for d, text in docs.items():
        raw = text + NFC_SUFFIX if d % 7 == 2 else text
        nfc = unicodedata.normalize("NFC", raw)
        r = got[d]
        assert r["n_chars_raw"] == len(raw), d
        assert r["n_chars_nfc"] == len(nfc), d
        assert r["changed"] == int(raw != nfc), d
        assert r["nfc_md5"] == hashlib.md5(nfc.encode()).hexdigest(), d
        if d % 7 == 2:
            n_injected += 1
            assert r["changed"] == 1 and (
                r["n_chars_raw"] - r["n_chars_nfc"] == 2
            ), d
    assert n_injected > 0


def test_inverted_index_matches_python_replica(spark):
    """Full-table exact equality vs a pure-Python positional index:
    same top-K vocab tie-break (count desc, token), same 0-based
    positions, one posting row per (term, doc)."""
    import re
    from collections import Counter, defaultdict

    from rxtls_spark.queries_training import IDX_TOPK, q_inverted_index
    from tests.conftest import SF_SMOKE

    ws = re.compile(r"[ \t\n\x0B\f\r]+")
    docs = {
        r["doc_id"]: ws.split(r["text"].strip().lower())
        for r in spark.read.parquet(f"{SF_SMOKE}/documents.parquet").collect()
        if r["text"].strip() != ""
    }
    cnt = Counter(t for toks in docs.values() for t in toks)
    top = set(
        t for t, _ in sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[
            :IDX_TOPK
        ]
    )
    want = defaultdict(lambda: [0, None, None])  # tf, first, last
    for d, toks in docs.items():
        for i, t in enumerate(toks):
            if t in top:
                e = want[(t, d)]
                e[0] += 1
                e[1] = i if e[1] is None else e[1]
                e[2] = i
    got = {
        (r["term"], r["doc_id"]): (r["tf"], r["first_pos"], r["last_pos"])
        for r in q_inverted_index(spark, SF_SMOKE).collect()
    }
    assert got == {k: tuple(v) for k, v in want.items()}
    # the synthetic corpus vocab can be smaller than IDX_TOPK
    assert len({t for t, _ in got}) == min(IDX_TOPK, len(cnt))


def test_url_canonicalize_matches_urllib_replica(spark):
    """Independent replica via urllib.parse (a REAL URL parser, not
    the same string-op chain): canonical form, group sizes, and keeper
    flags all match; injected variants genuinely collide (groups > 1
    from sf0.01 moduli up when the corpus is big enough); no UDF in
    the plan and exactly ONE shuffle exchange (the canon-url window)."""
    from urllib.parse import parse_qsl, urlsplit

    from rxtls_spark.plans.checks import count_exchanges, plan_string
    from rxtls_spark.queries_training import q_url_canonicalize
    from tests.conftest import SF_SMOKE

    df = q_url_canonicalize(spark, SF_SMOKE)
    p = plan_string(df, mode="simple")
    assert "ArrowEvalPython" not in p and "BatchEvalPython" not in p, p
    assert count_exchanges(df) == 1, p

    rows = df.collect()
    canon_want = {}
    for r in rows:
        u = urlsplit(r["raw_url"])
        host = u.netloc.lower()
        host = host[: -len(":443")] if host.endswith(":443") else host
        path = u.path.rstrip("/") or "/"
        params = sorted(
            f"{k}={v}"
            for k, v in parse_qsl(u.query)
            if not k.startswith("utm_") and k not in ("fbclid", "gclid")
        )
        canon = f"{u.scheme.lower()}://{host}{path}"
        if params:
            canon += "?" + "&".join(params)
        canon_want[r["doc_id"]] = canon
        assert r["canon_url"] == canon, (r["doc_id"], r["canon_url"], canon)

    from collections import Counter

    sizes = Counter(canon_want.values())
    keepers = {}
    for d, c in canon_want.items():
        keepers[c] = min(keepers.get(c, d), d)
    for r in rows:
        assert r["n_variants"] == sizes[r["canon_url"]]
        assert r["is_keeper"] == int(keepers[r["canon_url"]] == r["doc_id"])
    if len(canon_want) > 385:  # lcm of the component moduli
        assert max(sizes.values()) > 1


def test_el2n_prune_matches_python_and_global_topk(spark):
    """el2n_e3 recomputed in Python (math.exp over the trained weights
    and the engine-computed features — the e3 floor absorbs exp ulp),
    and the kept set is bit-identical to the global
    orderBy(desc(score), doc_id).limit(k) with k = max(1, n*NUM//DEN)."""
    import math

    from rxtls_spark.queries_training import (
        EL2N_KEEP_DEN,
        EL2N_KEEP_NUM,
        _logreg_train,
        logreg_features,
        q_el2n_prune,
    )
    from tests.conftest import SF_SMOKE

    fx = logreg_features(
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    )
    feats = {
        r["doc_id"]: (r["x1"], r["x2"], r["x3"], r["y"])
        for r in fx.collect()
    }
    _, wv = _logreg_train(fx)
    scores = {}
    for d, (x1, x2, x3, y) in feats.items():
        m = wv[0] * 1.0 + wv[1] * x1 + wv[2] * x2 + wv[3] * x3
        p = 1.0 / (1.0 + math.exp(-m))
        scores[d] = math.floor(abs(p - y) * 1000 + 0.5)
    n = len(feats)
    k = max(1, n * EL2N_KEEP_NUM // EL2N_KEEP_DEN)
    kept = sorted(scores, key=lambda d: (-scores[d], d))[:k]

    got = {
        r["doc_id"]: r["el2n_e3"]
        for r in q_el2n_prune(spark, SF_SMOKE).collect()
    }
    assert got == {d: scores[d] for d in kept}
    assert len(got) == k


def test_lm_eval_holdout_trains_on_train_only(spark):
    """Independent Python replica of the held-out eval: vocab counts
    come ONLY from train-split docs (knuth permille < VAL_FROM), every
    non-empty doc is scored with that vocab, split labels follow the
    holdout rule, and the stable-rounded averages match exactly."""
    import math
    import re

    from rxtls_spark.functions.hashing import KNUTH_A, KNUTH_P
    from rxtls_spark.queries_training import (
        BIGRAM_VOCAB_K,
        HOLDOUT_TEST_FROM,
        HOLDOUT_VAL_FROM,
        q_lm_eval_holdout,
    )
    from tests.conftest import SF_SMOKE

    docs = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{SF_SMOKE}/documents.parquet").collect()
    }
    ws = re.compile(r"[ \t\n\x0B\f\r]+")
    toks = {
        d: ws.split(t.strip().lower())
        for d, t in docs.items()
        if t.strip() != ""
    }

    def split_of(d):
        pm = ((d % KNUTH_P) * KNUTH_A) % KNUTH_P % 1000
        if pm >= HOLDOUT_TEST_FROM:
            return "test"
        if pm >= HOLDOUT_VAL_FROM:
            return "val"
        return "train"

    bigrams = {
        d: [f"{t[i]} {t[i + 1]}" for i in range(len(t) - 1)]
        for d, t in toks.items()
    }
    c2: dict[str, int] = {}
    c1: dict[str, int] = {}
    for d, t in toks.items():
        if split_of(d) != "train":
            continue
        for w in t:
            c1[w] = c1.get(w, 0) + 1
        for b in bigrams[d]:
            c2[b] = c2.get(b, 0) + 1
    top = sorted(c2.items(), key=lambda kv: (-kv[1], kv[0]))[:BIGRAM_VOCAB_K]
    vocab = {b: math.log(c / c1[b.split(" ")[0]]) for b, c in top}

    out = {
        r["doc_id"]: r for r in q_lm_eval_holdout(spark, SF_SMOKE).collect()
    }
    assert set(out) == set(toks)
    n_eval = 0
    for d, bs in bigrams.items():
        r = out[d]
        assert r["split"] == split_of(d), d
        if r["split"] != "train":
            n_eval += 1
        lps = [vocab[b] for b in bs if b in vocab]
        assert r["n_bigrams"] == len(bs)
        assert r["n_oov"] == len(bs) - len(lps)
        if lps:
            s = 0.0
            for x in lps:
                s += x
            assert r["avg_logprob"] == (
                math.floor(s / len(lps) * 1000.0 + 0.5) / 1000.0
            ), d
        else:
            assert r["avg_logprob"] is None
    assert n_eval > 0  # the smoke corpus genuinely has held-out docs


def test_calibration_bins_matches_python_replica(spark):
    """Per-bin counts and BIGINT sums recomputed in Python (math.exp
    over the trained weights and the engine-computed features — the
    e3 floor absorbs exp ulp, the replica is exact past it).  Also
    locks the invariants: bins within [0, CALIB_BINS-1], counts sum
    to the corpus size, n_pos <= n, and sum_p_e3 <= 1000*n."""
    import math
    from collections import defaultdict

    from rxtls_spark.queries_training import (
        CALIB_BINS,
        _logreg_train,
        logreg_features,
        q_calibration_bins,
    )
    from tests.conftest import SF_SMOKE

    fx = logreg_features(
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    )
    feats = [
        (r["x1"], r["x2"], r["x3"], r["y"]) for r in fx.collect()
    ]
    _, wv = _logreg_train(fx)
    agg = defaultdict(lambda: [0, 0, 0, 0])  # n, n_pos, sum_p, sum_err
    for x1, x2, x3, y in feats:
        m = wv[0] * 1.0 + wv[1] * x1 + wv[2] * x2 + wv[3] * x3
        p = 1.0 / (1.0 + math.exp(-m))
        p_e3 = math.floor(p * 1000 + 0.5)
        err_e3 = math.floor(abs(p - y) * 1000 + 0.5)
        b = min(p_e3 // 100, CALIB_BINS - 1)
        agg[b][0] += 1
        agg[b][1] += int(y)
        agg[b][2] += p_e3
        agg[b][3] += err_e3

    got = {r["bin"]: r for r in q_calibration_bins(spark, SF_SMOKE).collect()}
    assert set(got) == set(agg)
    assert sum(r["n"] for r in got.values()) == len(feats)
    for b, (n, n_pos, sum_p, sum_err) in agg.items():
        r = got[b]
        assert 0 <= b <= CALIB_BINS - 1
        assert (r["n"], r["n_pos"], r["sum_p_e3"], r["sum_err_e3"]) == (
            n,
            n_pos,
            sum_p,
            sum_err,
        ), b
        assert r["n_pos"] <= r["n"] and r["sum_p_e3"] <= 1000 * r["n"]


def test_tokenizer_fertility_matches_bpe_encode_rollup(spark):
    """The per-lang fertility table must equal a Python rollup of the
    (already oracle-proven) per-doc `q_bpe_encode` output joined with
    each doc's lang: BIGINT sums, integer-DIV pooled ratios, and the
    zero-word-language drop.  az_chars is recomputed independently
    with Python re over the raw text."""
    import re
    from collections import defaultdict

    from rxtls_spark.queries_training import (
        q_bpe_encode,
        q_tokenizer_fertility,
    )
    from tests.conftest import SF_SMOKE

    enc = {
        r["doc_id"]: r
        for r in q_bpe_encode(spark, SF_SMOKE).collect()
    }
    docs = (
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .select("doc_id", "lang", "text")
        .collect()
    )
    agg = defaultdict(lambda: [0, 0, 0, 0])  # docs, words, toks, chars
    for d in docs:
        e = enc[d["doc_id"]]
        a = agg[d["lang"]]
        a[0] += 1
        a[1] += e["n_words"]
        a[2] += e["n_bpe_tokens"]
        a[3] += sum(len(w) for w in re.findall(r"[a-z]+", d["text"]))

    got = {
        r["lang"]: r
        for r in q_tokenizer_fertility(spark, SF_SMOKE).collect()
    }
    want = {lang: a for lang, a in agg.items() if a[1] > 0}
    assert set(got) == set(want)
    for lang, (n_docs, n_words, n_toks, az_chars) in want.items():
        r = got[lang]
        assert (
            r["n_docs"],
            r["n_words"],
            r["n_bpe_tokens"],
            r["az_chars"],
        ) == (n_docs, n_words, n_toks, az_chars), lang
        assert r["fertility_e5"] == (n_toks * 100000) // n_words
        assert r["chars_per_token_e5"] == (az_chars * 100000) // n_toks
        # fertility >= 1 token/word by construction (</w> per word)
        assert r["fertility_e5"] >= 100000


def test_source_ks_drift_matches_python_replica(spark):
    """Per-pair KS distances recomputed in Python from the Spark
    quality scores (the score itself is oracle-proven): exact BIGINT
    equality on the e9 CDFs.  Also locks: all ordered pairs present,
    ks_e9 in [0, 1e9], and KS(a,b) is symmetric by construction."""
    import math
    from collections import defaultdict
    from itertools import combinations

    from pyspark.sql import functions as F

    from rxtls_spark.functions.text import quality_score
    from rxtls_spark.queries_training import _docs, q_source_ks_drift
    from tests.conftest import SF_SMOKE

    scored = (
        _docs(spark, SF_SMOKE)
        .select("source", quality_score().alias("quality"))
        .collect()
    )
    hist = defaultdict(lambda: defaultdict(int))
    for r in scored:
        qb = math.floor(r["quality"] * 100000 + 0.5) // 100
        hist[r["source"]][qb] += 1
    buckets = sorted({qb for h in hist.values() for qb in h})
    cdf = {}
    n = {}
    for src, h in hist.items():
        n[src] = sum(h.values())
        cum = 0
        cdf[src] = {}
        for qb in buckets:
            cum += h.get(qb, 0)
            cdf[src][qb] = (cum * 1_000_000_000) // n[src]

    got = {
        (r["source_a"], r["source_b"]): r
        for r in q_source_ks_drift(spark, SF_SMOKE).collect()
    }
    want_pairs = set(combinations(sorted(hist), 2))
    assert set(got) == want_pairs
    for (a, b), r in got.items():
        ks = max(abs(cdf[a][qb] - cdf[b][qb]) for qb in buckets)
        assert (r["n_a"], r["n_b"], r["ks_e9"]) == (n[a], n[b], ks), (a, b)
        assert 0 <= r["ks_e9"] <= 1_000_000_000


def _trunc_div(num: int, den: int) -> int:
    """Integer division truncating toward zero — Spark DIV and DuckDB //
    semantics (Python // floors toward -inf, which differs for negative
    numerators)."""
    q = abs(num) // abs(den)
    return q if (num >= 0) == (den > 0) else -q


def _ws_tokens(text: str) -> list[str]:
    import re

    t = text.strip()
    return re.split("[ \t\n\x0B\f\r]+", t) if t else []


def test_cluster_canonical_keeps_longest_member(spark):
    """Keep-longest selection: exactly one canon per cluster, canon =
    argmax(n_chars DESC, doc_id), and every near cluster's canon is the
    ' extra!' variant (LONGER than the root) — proving the rule is
    genuinely length-based, not min-id in disguise."""
    from collections import defaultdict

    from rxtls_spark.queries_training import q_cluster_canonical
    from tests.conftest import SF_SMOKE

    rows = q_cluster_canonical(spark, SF_SMOKE).collect()
    assert rows
    by_cluster = defaultdict(list)
    for r in rows:
        by_cluster[r["cluster_root"]].append(r)
    for root, members in by_cluster.items():
        keeps = [r for r in members if r["keep"] == 1]
        assert len(keeps) == 1, root
        best = min(members, key=lambda r: (-r["n_chars"], r["doc_id"]))
        assert keeps[0]["doc_id"] == best["doc_id"] == keeps[0]["canon_id"]
        # every member agrees on canon_id
        assert {r["canon_id"] for r in members} == {best["doc_id"]}
    near_clusters = [
        ms for ms in by_cluster.values()
        if any(r["doc_id"] >= 2_000_000_000 for r in ms)
    ]
    assert near_clusters, "injected near-dups must form clusters"
    for ms in near_clusters:
        canon = ms[0]["canon_id"]
        assert canon >= 2_000_000_000, "longest member is the ' extra!' copy"


def test_temperature_mix_matches_replica_and_damps(spark):
    """Exact replica of the alpha=0.5 temperature weights from the raw
    docs, plus the semantic property: temperature sampling moves every
    language's share toward uniform (dominant lang down, rare lang up)."""
    import math
    from collections import Counter

    from rxtls_spark.queries_training import _docs, q_temperature_mix
    from tests.conftest import SF_SMOKE

    docs = _docs(spark, SF_SMOKE).select("lang", "text").collect()
    n_tok = Counter()
    n_doc = Counter()
    for r in docs:
        n_doc[r["lang"]] += 1
        n_tok[r["lang"]] += len(_ws_tokens(r["text"]))
    w = {lg: math.floor(math.sqrt(n) * 1000) for lg, n in n_tok.items()}
    tot_w, tot_t = sum(w.values()), sum(n_tok.values())

    got = {r["lang"]: r for r in q_temperature_mix(spark, SF_SMOKE).collect()}
    assert set(got) == set(n_tok)
    for lg, r in got.items():
        share = (w[lg] * 10**9) // tot_w
        natural = (n_tok[lg] * 10**9) // tot_t
        alloc = share * (tot_t // 10**9) + (share * (tot_t % 10**9)) // 10**9
        assert (
            r["n_docs"], r["n_tokens"], r["w_e3"],
            r["share_e9"], r["alloc_tokens"], r["natural_e9"],
        ) == (n_doc[lg], n_tok[lg], w[lg], share, alloc, natural), lg
    # damping: the most natural-dominant lang loses share, the rarest gains
    hi = max(got.values(), key=lambda r: r["natural_e9"])
    lo = min(got.values(), key=lambda r: r["natural_e9"])
    assert hi["share_e9"] <= hi["natural_e9"]
    assert lo["share_e9"] >= lo["natural_e9"]


def test_zipf_alpha_matches_python_ols(spark):
    """Exact-integer OLS replica (e3-floored logs, truncating division)
    and the semantic check: every source's fitted slope is negative
    (counts decrease with rank)."""
    import math
    from collections import Counter, defaultdict

    from rxtls_spark.queries_training import ZIPF_TOPK, _docs, q_zipf_alpha
    from tests.conftest import SF_SMOKE

    docs = _docs(spark, SF_SMOKE).select("source", "text").collect()
    cnt = defaultdict(Counter)
    for r in docs:
        toks = _ws_tokens(r["text"].lower())
        if toks:
            cnt[r["source"]].update(toks)

    got = {r["source"]: r for r in q_zipf_alpha(spark, SF_SMOKE).collect()}
    assert set(got) == set(cnt)
    for src, c in cnt.items():
        top = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:ZIPF_TOPK]
        pts = [
            (math.floor(math.log(rk) * 1000), math.floor(math.log(n) * 1000))
            for rk, (_, n) in enumerate(top, start=1)
        ]
        k = len(pts)
        sx = sum(x for x, _ in pts)
        sy = sum(y for _, y in pts)
        sxy = sum(x * y for x, y in pts)
        sxx = sum(x * x for x, _ in pts)
        slope = _trunc_div((k * sxy - sx * sy) * 10**6, k * sxx - sx * sx)
        r = got[src]
        assert (r["k"], r["sy"], r["slope_e6"]) == (k, sy, slope), src
        assert r["slope_e6"] < 0, src


def test_postings_size_matches_leb128_reference(spark):
    """The compare-ladder byte counts must equal a real LEB128 encoder's
    output length on every gap, and delta+varint must never exceed the
    raw fixed-width size."""
    from collections import Counter, defaultdict

    from rxtls_spark.queries_training import (
        IDX_TOPK,
        _docs,
        q_postings_size,
    )
    from tests.conftest import SF_SMOKE

    def leb128_len(v: int) -> int:
        n = 1
        while v >= 0x80:
            v >>= 7
            n += 1
        return n

    docs = _docs(spark, SF_SMOKE).select("doc_id", "text").collect()
    tok_cnt = Counter()
    per_doc = {}
    for r in docs:
        toks = _ws_tokens(r["text"].lower())
        if toks:
            per_doc[r["doc_id"]] = set(toks)
            tok_cnt.update(toks)
    vocab = {
        t for t, _ in sorted(tok_cnt.items(), key=lambda kv: (-kv[1], kv[0]))[
            :IDX_TOPK
        ]
    }
    postings = defaultdict(list)
    for doc_id in sorted(per_doc):
        for t in per_doc[doc_id] & vocab:
            postings[t].append(doc_id)

    got = {r["term"]: r for r in q_postings_size(spark, SF_SMOKE).collect()}
    assert set(got) == set(postings)
    for term, ids in postings.items():
        gaps = [ids[0]] + [b - a for a, b in zip(ids, ids[1:])]
        vb = sum(leb128_len(g) for g in gaps)
        r = got[term]
        assert (r["n_docs"], r["raw_bytes"], r["varint_bytes"]) == (
            len(ids), 8 * len(ids), vb,
        ), term
        assert r["varint_bytes"] <= r["raw_bytes"]


def test_source_overlap_matches_python_replica(spark):
    """Pair counts recomputed from raw docs (distinct heads per source,
    all unordered pairs), plus: no self-pairs, counts bounded by the
    smaller side's head count."""
    from collections import defaultdict
    from itertools import combinations

    from rxtls_spark.queries_training import (
        OVERLAP_W,
        _docs,
        q_source_overlap,
    )
    from tests.conftest import SF_SMOKE

    docs = _docs(spark, SF_SMOKE).select("source", "text").collect()
    heads = defaultdict(set)
    for r in docs:
        toks = _ws_tokens(r["text"].lower())
        if toks:
            heads[r["source"]].add(" ".join(toks[:OVERLAP_W]))
    want = {}
    for a, b in combinations(sorted(heads), 2):
        n = len(heads[a] & heads[b])
        if n:
            want[(a, b)] = n

    got = {
        (r["source_a"], r["source_b"]): r["n_shared_heads"]
        for r in q_source_overlap(spark, SF_SMOKE).collect()
    }
    assert got == want
    for (a, b), n in got.items():
        assert a < b
        assert n <= min(len(heads[a]), len(heads[b]))


def test_source_kl_matches_python_replica(spark):
    """Exact-integer KL replica over the hashed-bucket space, plus the
    floored-log lower bound: true KL >= 0 survives flooring as
    kl_ne3 >= -(n_s + 64)."""
    import hashlib
    import math
    from collections import Counter, defaultdict

    from rxtls_spark.queries_training import _docs, q_source_kl
    from tests.conftest import SF_SMOKE

    docs = _docs(spark, SF_SMOKE).select("source", "text").collect()
    cnt = defaultdict(Counter)
    for r in docs:
        for tok in _ws_tokens(r["text"].lower()):
            h = hashlib.md5(tok.encode()).hexdigest()
            cnt[r["source"]][(int(h[0], 16) * 16 + int(h[1], 16)) % 64] += 1
    cb = Counter()
    for c in cnt.values():
        cb.update(c)
    n_total = sum(cb.values())

    got = {r["source"]: r for r in q_source_kl(spark, SF_SMOKE).collect()}
    assert set(got) == set(cnt)
    for src, c in cnt.items():
        n_s = sum(c.values())
        kl = 0
        for b in range(64):
            lp = math.floor(math.log((c[b] + 1) / (n_s + 64.0)) * 1000)
            lq = math.floor(
                math.log((cb[b] + 1) / (n_total + 64.0)) * 1000
            )
            kl += (c[b] + 1) * (lp - lq)
        r = got[src]
        assert (r["n_tokens"], r["kl_ne3"]) == (n_s, kl), src
        assert r["kl_ne3"] >= -(n_s + 64), src
        tq = abs(kl) // (n_s + 64)
        assert r["kl_e3"] == (tq if kl >= 0 else -tq), src


def test_doc_rarity_matches_python_replica(spark):
    """Exact-integer replica of the IDF-rarity fold (e3-floored ln,
    truncating division) plus the semantic floor: idf terms are never
    negative (df <= N always), so every rarity is >= 0."""
    import math
    from collections import Counter

    from rxtls_spark.queries_training import _docs, q_doc_rarity
    from tests.conftest import SF_SMOKE

    docs = [
        (r["doc_id"], _ws_tokens(r["text"].lower()))
        for r in _docs(spark, SF_SMOKE).select("doc_id", "text").collect()
        if r["text"].strip()
    ]
    n_docs = len(docs)
    df = Counter()
    for _, toks in docs:
        df.update(set(toks))

    got = {r["doc_id"]: r for r in q_doc_rarity(spark, SF_SMOKE).collect()}
    assert set(got) == {d for d, _ in docs}
    for doc_id, toks in docs:
        s = sum(
            math.floor(math.log(n_docs / df[t]) * 1000.0) for t in toks
        )
        r = got[doc_id]
        assert (r["n_toks"], r["sum_idf_e3"], r["rarity_e3"]) == (
            len(toks), s, _trunc_div(s, len(toks)),
        ), doc_id
        assert r["rarity_e3"] >= 0, doc_id


def test_weighted_sample_matches_python_replica(spark):
    """Efraimidis–Spirakis selection replica: recompute every doc's
    priority key from the oracle-checked quality (q_text_features) and
    the knuth-hash uniform, take the top-K by (key DESC, doc_id), and
    require the IDENTICAL sample.  Also locks the key invariants:
    keys are <= 0 (u in (0,1] so ln(u) <= 0) and the returned rows are
    in selection order."""
    import math

    from rxtls_spark.functions.hashing import KNUTH_A, KNUTH_P
    from rxtls_spark.queries_training import (
        WSAMPLE_K,
        q_text_features,
        q_weighted_sample,
    )
    from tests.conftest import SF_SMOKE

    keyed = []
    for r in q_text_features(spark, SF_SMOKE).select(
        "doc_id", "quality"
    ).collect():
        w_e5 = math.floor(r["quality"] * 100000 + 0.5) + 1
        h = ((r["doc_id"] % KNUTH_P) * KNUTH_A) % KNUTH_P
        lnu_e6 = math.floor(
            math.log((h + 1) / float(KNUTH_P + 1)) * 1000000.0
        )
        keyed.append(
            (r["doc_id"], w_e5, _trunc_div(lnu_e6 * 100000, w_e5))
        )
    expect = sorted(keyed, key=lambda t: (-t[2], t[0]))[:WSAMPLE_K]

    rows = q_weighted_sample(spark, SF_SMOKE).collect()
    got = [(r["doc_id"], r["w_e5"], r["key_e"]) for r in rows]
    assert got == expect
    assert all(k <= 0 for _, _, k in got)


def test_kn_bigram_score_matches_python_replica(spark):
    """Kneser–Ney replica: recompute c12/c1/N1post/N1pre/B in Python,
    reproduce the exact float expression (same operand order) and the
    e3-floored lp per bigram type, fold per doc.  Also locks the
    smoothing guarantees: every observed bigram gets lp < = 0 (P <= 1),
    and for each left word the discounted+backoff mass over its
    OBSERVED successors stays strictly within (0, 1]."""
    import math
    from collections import Counter, defaultdict

    from rxtls_spark.queries_training import _docs, q_kn_bigram_score
    from tests.conftest import SF_SMOKE

    docs = [
        (r["doc_id"], _ws_tokens(r["text"].lower()))
        for r in _docs(spark, SF_SMOKE).select("doc_id", "text").collect()
        if r["text"].strip()
    ]
    c12 = Counter()
    for _, toks in docs:
        for a, bword in zip(toks, toks[1:]):
            c12[(a, bword)] += 1
    c1 = Counter()
    n1post = Counter()
    n1pre = Counter()
    for (a, bword), c in c12.items():
        c1[a] += c
        n1post[a] += 1
        n1pre[bword] += 1
    bb = float(len(c12))

    def lp(a, bword):
        num = float(max(4 * c12[(a, bword)] - 3, 0)) * bb + (
            3.0 * n1post[a]
        ) * n1pre[bword]
        return math.floor(math.log(num / (4.0 * c1[a] * bb)) * 1000.0)

    got = {r["doc_id"]: r for r in q_kn_bigram_score(spark, SF_SMOKE).collect()}
    assert set(got) == {d for d, _ in docs}
    for doc_id, toks in docs:
        pairs = list(zip(toks, toks[1:]))
        r = got[doc_id]
        if not pairs:
            assert (r["n_pairs"], r["sum_lp_e3"], r["avg_lp_e3"]) == (
                0, None, None,
            )
            continue
        s = sum(lp(a, bword) for a, bword in pairs)
        assert (r["n_pairs"], r["sum_lp_e3"], r["avg_lp_e3"]) == (
            len(pairs), s, _trunc_div(s, len(pairs)),
        ), doc_id
        assert r["sum_lp_e3"] <= 0

    # probability-mass sanity on the un-floored model: for each w1,
    # sum over observed w2 of P_KN(w2|w1) must be in (0, 1]
    succ = defaultdict(list)
    for (a, bword), c in c12.items():
        succ[a].append(bword)
    for a, ws in list(succ.items())[:200]:
        mass = sum(
            (max(c12[(a, w)] - 0.75, 0.0) / c1[a])
            + (0.75 * n1post[a] / c1[a]) * (n1pre[w] / bb)
            for w in ws
        )
        assert 0.0 < mass <= 1.0 + 1e-9, a


def test_minhash_calibration_matches_python_replica(spark):
    """Full replica of the calibration harness — md5-prefix keys, the
    knuth permutation family, signature match counts, exact shingle
    Jaccard — plus the semantic ordering the harness exists to show:
    near pairs are more similar than half pairs than far pairs on BOTH
    the exact and the estimated scale, and the 16-perm estimator's
    mean error is within 3 estimator-sd of zero."""
    import hashlib
    import statistics

    from rxtls_spark.functions.hashing import KNUTH_A, KNUTH_P
    from rxtls_spark.queries_training import (
        CAL_EVERY,
        CAL_PERMS,
        CAL_STEP,
        _docs,
        q_minhash_calibration,
    )
    from tests.conftest import SF_SMOKE

    toks = {
        r["doc_id"]: _ws_tokens(r["text"].lower().strip())
        for r in _docs(spark, SF_SMOKE).select("doc_id", "text").collect()
        if r["text"].strip()
    }

    def shingles(ws):
        if len(ws) >= 3:
            return [" ".join(ws[i : i + 3]) for i in range(len(ws) - 2)]
        return [" ".join(ws)]

    def key(g):
        return int(hashlib.md5(g.encode()).hexdigest()[:13], 16)

    def sig(sh):
        ks = [key(g) for g in sh]
        return [
            min((((x + k * CAL_STEP) % KNUTH_P) * KNUTH_A) % KNUTH_P for x in ks)
            for k in range(CAL_PERMS)
        ]

    expect = {}
    for d, wa in toks.items():
        if d % CAL_EVERY != 0 or (d + 1) not in toks:
            continue
        wb = toks[d + 1]
        variants = {
            "near": wa + ["extra!"],
            "half": wa[: (len(wa) + 1) // 2] + wb[len(wb) // 2 :],
            "far": wb,
        }
        sa = shingles(wa)
        for kind, kb in variants.items():
            sb = shingles(kb)
            inter = len([x for x in dict.fromkeys(sa) if x in sb])
            union = len(set(sa) | set(sb))
            m = sum(x == y for x, y in zip(sig(sa), sig(sb)))
            expect[(d, kind)] = (
                len(set(sa)), len(set(sb)),
                inter * 100000 // union, m, m * 100000 // CAL_PERMS,
            )

    rows = q_minhash_calibration(spark, SF_SMOKE).collect()
    got = {(r["doc_a"], r["pair_kind"]): r for r in rows}
    assert set(got) == set(expect)
    for k, (na, nb, ex, m, est) in expect.items():
        r = got[k]
        assert (
            r["n_sh_a"], r["n_sh_b"], r["exact_e5"], r["est_matches"],
            r["est_e5"], r["err_e5"],
        ) == (na, nb, ex, m, est, est - ex), k

    by_kind = {
        kind: [r for (d, kk), r in got.items() if kk == kind]
        for kind in ("near", "half", "far")
    }
    mean_ex = {
        k: statistics.mean(r["exact_e5"] for r in v)
        for k, v in by_kind.items()
    }
    mean_est = {
        k: statistics.mean(r["est_e5"] for r in v) for k, v in by_kind.items()
    }
    assert mean_ex["near"] > mean_ex["half"] > mean_ex["far"]
    assert mean_est["near"] > mean_est["half"] > mean_est["far"]
    for kind, v in by_kind.items():
        n = len(v)
        j = mean_ex[kind] / 100000.0
        sd = (max(j * (1 - j), 1e-4) / CAL_PERMS) ** 0.5 * 100000
        mean_err = statistics.mean(r["err_e5"] for r in v)
        assert abs(mean_err) <= 3 * sd / (n ** 0.5) + 100000 / CAL_PERMS, kind


def test_blocklist_filter_matches_python_replica(spark):
    """Occurrence counts equal Python's non-overlapping str.count, the
    severity is their weighted sum, and the verdict CASE is ordered
    block-first.  Also requires all three verdict classes to actually
    occur at SF_SMOKE — a blocklist whose corpus never trips it tests
    nothing."""
    from rxtls_spark.queries_training import (
        BLOCK_PHRASES,
        BLOCK_T_BLOCK,
        BLOCK_T_REVIEW,
        _docs,
        q_blocklist_filter,
    )
    from tests.conftest import SF_SMOKE

    texts = {
        r["doc_id"]: r["text"].lower()
        for r in _docs(spark, SF_SMOKE).select("doc_id", "text").collect()
    }
    got = {r["doc_id"]: r for r in q_blocklist_filter(spark, SF_SMOKE).collect()}
    assert set(got) == set(texts)
    seen = set()
    for doc_id, t in texts.items():
        r = got[doc_id]
        sev = 0
        for p, w in BLOCK_PHRASES:
            n = t.count(p)
            assert r[f"n_{p.replace(' ', '_')}"] == n, (doc_id, p)
            sev += n * w
        assert r["severity"] == sev
        want = (
            "block"
            if sev >= BLOCK_T_BLOCK
            else "review" if sev >= BLOCK_T_REVIEW else "clean"
        )
        assert r["verdict"] == want, doc_id
        seen.add(want)
    assert seen == {"block", "review", "clean"}


def test_char_entropy_matches_python_replica(spark):
    """Exact-integer entropy replica (e3-floored ln per bucket,
    truncating division) plus the semantic bounds: 0 <= H <= ln(38)
    nats, and a repeated-single-char doc would score ~0 (verified on
    the fold directly)."""
    import math
    from collections import Counter

    from rxtls_spark.queries_training import (
        ENTROPY_CHARS,
        _docs,
        q_char_entropy,
    )
    from tests.conftest import SF_SMOKE

    def replica(text):
        t = text.lower()
        n = len(t)
        cnts = [t.count(c) for c in ENTROPY_CHARS]
        cnts.append(n - sum(cnts))
        lnn = math.floor(math.log(n) * 1000.0)
        h = sum(
            c * (lnn - math.floor(math.log(c) * 1000.0))
            for c in cnts
            if c > 0
        )
        return n, cnts[-1], h, _trunc_div(h, n)

    texts = {
        r["doc_id"]: r["text"]
        for r in _docs(spark, SF_SMOKE).select("doc_id", "text").collect()
        if len(r["text"]) > 0
    }
    got = {r["doc_id"]: r for r in q_char_entropy(spark, SF_SMOKE).collect()}
    assert set(got) == set(texts)
    for doc_id, text in texts.items():
        n, other, h, e = replica(text)
        r = got[doc_id]
        assert (
            r["n_chars_l"], r["n_other"], r["h_sum_e3"], r["entropy_e3"],
        ) == (n, other, h, e), doc_id
        assert 0 <= r["entropy_e3"] <= math.ceil(math.log(38) * 1000)

    assert replica("aaaaaaaaaa")[3] == 0  # degenerate doc scores zero


def test_scorer_agreement_matches_python_replica(spark):
    """Spearman replica over the deterministic per-source sample:
    recompute both scores' (score, doc_id)-tie-broken ranks in Python
    and the exact-integer rho; also lock the formula's range
    (|rho_e6| <= 1e6 + rounding) and the n >= 2 guard."""
    from rxtls_spark.functions.hashing import KNUTH_A, KNUTH_P
    from rxtls_spark.queries_training import (
        AGREE_K,
        q_doc_rarity,
        q_scorer_agreement,
        q_text_features,
    )
    from tests.conftest import SF_SMOKE
    import math

    rar = {
        r["doc_id"]: r["rarity_e3"]
        for r in q_doc_rarity(spark, SF_SMOKE).collect()
    }
    feats = {
        r["doc_id"]: math.floor(r["quality"] * 100000 + 0.5)
        for r in q_text_features(spark, SF_SMOKE).collect()
    }
    src = {
        r["doc_id"]: r["source"]
        for r in spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .select("doc_id", "source")
        .collect()
    }
    by_src = {}
    for d, rscore in rar.items():
        h = ((d % KNUTH_P) * KNUTH_A) % KNUTH_P
        by_src.setdefault(src[d], []).append((h, d, feats[d], rscore))
    expect = {}
    for s, rows in by_src.items():
        kept = sorted(rows)[:AGREE_K]
        n = len(kept)
        if n < 2:
            continue
        ra = {
            d: i + 1
            for i, (_, d, q, _r) in enumerate(
                sorted(kept, key=lambda t: (t[2], t[1]))
            )
        }
        rb = {
            d: i + 1
            for i, (_, d, _q, r) in enumerate(
                sorted(kept, key=lambda t: (t[3], t[1]))
            )
        }
        sum_d2 = sum((ra[d] - rb[d]) ** 2 for _, d, _q, _r in kept)
        rho = 1000000 - _trunc_div(6 * sum_d2 * 1000000, n * (n * n - 1))
        expect[s] = (n, sum_d2, rho)

    got = {r["source"]: r for r in q_scorer_agreement(spark, SF_SMOKE).collect()}
    assert set(got) == set(expect)
    for s, (n, sum_d2, rho) in expect.items():
        r = got[s]
        assert (r["n"], r["sum_d2"], r["rho_e6"]) == (n, sum_d2, rho), s
        assert -1000004 <= r["rho_e6"] <= 1000000


def test_rake_keywords_matches_python_replica(spark):
    """Full RAKE replica — stoplist islands, degree/frequency word
    scores, occurrence-summed phrase scores, (score DESC, phrase)
    top-k — plus the structural facts: phrases contain no stopwords,
    n_words == token count of the phrase, and ranks are 1..k dense per
    doc."""
    from collections import Counter, defaultdict

    from rxtls_spark.functions.text import STOPWORDS
    from rxtls_spark.queries_training import (
        RAKE_TOPK,
        _docs,
        q_rake_keywords,
    )
    from tests.conftest import SF_SMOKE

    stop = set(STOPWORDS)
    expect = {}
    for r in _docs(spark, SF_SMOKE).select("doc_id", "text").collect():
        toks = _ws_tokens(r["text"].lower())
        if not toks:
            continue
        phrases, cur = [], []
        for t in toks:
            if t in stop:
                if cur:
                    phrases.append(cur)
                cur = []
            else:
                cur.append(t)
        if cur:
            phrases.append(cur)
        if not phrases:
            continue
        freq, deg = Counter(), Counter()
        for ph in phrases:
            for t in ph:
                freq[t] += 1
                deg[t] += len(ph)
        wscore = {t: deg[t] * 1000 // freq[t] for t in freq}
        by_phrase = defaultdict(lambda: [0, 0, 0])  # n_words, score, n_occ
        for ph in phrases:
            key = " ".join(ph)
            s = sum(wscore[t] for t in ph)
            by_phrase[key] = [
                len(ph), s, by_phrase[key][2] + 1,
            ]
        ranked = sorted(
            by_phrase.items(), key=lambda kv: (-kv[1][1], kv[0])
        )[:RAKE_TOPK]
        expect[r["doc_id"]] = [
            (ph, v[0], v[1], v[2], i + 1) for i, (ph, v) in enumerate(ranked)
        ]

    rows = q_rake_keywords(spark, SF_SMOKE).collect()
    got = defaultdict(list)
    for r in rows:
        got[r["doc_id"]].append(
            (r["phrase"], r["n_words"], r["score_e3"], r["n_occ"], r["rk"])
        )
    for d in got:
        got[d].sort(key=lambda t: t[4])
    assert dict(got) == expect
    for d, lst in got.items():
        for ph, nw, _s, _o, rk in lst:
            ws = ph.split(" ")
            assert len(ws) == nw and not (set(ws) & stop), (d, ph)
        assert [t[4] for t in lst] == list(range(1, len(lst) + 1)), d


def test_oov_curve_matches_python_replica(spark):
    """Replica of the coverage sweep from raw token counts, plus the
    curve's structural guarantees: oov is non-increasing in K,
    coverage non-decreasing, and K >= n_types means full coverage."""
    from collections import Counter

    from rxtls_spark.queries_training import OOV_GRID, _docs, q_oov_curve
    from tests.conftest import SF_SMOKE

    cnt = Counter()
    for r in _docs(spark, SF_SMOKE).select("text").collect():
        cnt.update(_ws_tokens(r["text"].lower()))
    total = sum(cnt.values())
    ranked = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))

    got = {
        r["vocab_k"]: r
        for r in q_oov_curve(spark, SF_SMOKE).collect()
    }
    assert set(got) == set(OOV_GRID)
    prev_cov, prev_oov = -1, 1001
    for k in sorted(OOV_GRID):
        cov = sum(c for _, c in ranked[:k])
        r = got[k]
        assert (r["n_types"], r["cov_tokens"], r["oov_permille"]) == (
            min(k, len(ranked)), cov, (total - cov) * 1000 // total,
        ), k
        assert r["cov_tokens"] >= prev_cov and r["oov_permille"] <= prev_oov
        prev_cov, prev_oov = r["cov_tokens"], r["oov_permille"]
        if k >= len(ranked):
            assert r["oov_permille"] == 0


def test_dataset_card_matches_python_replica(spark):
    """Datasheet replica from raw rows plus internal consistency:
    dup-doc mass and group counts reconcile, token/char sums positive,
    metric set fixed and ordered."""
    from collections import Counter

    from rxtls_spark.queries_training import _docs, _emb, q_dataset_card
    from tests.conftest import SF_SMOKE

    rows = _docs(spark, SF_SMOKE).select("text", "source", "lang").collect()
    texts = [r["text"] for r in rows]
    cnt = Counter(texts)
    want = {
        "n_docs": len(rows),
        "n_sources": len({r["source"] for r in rows}),
        "n_langs": len({r["lang"] for r in rows}),
        "n_chars": sum(len(t) for t in texts),
        "n_tokens": sum(len(_ws_tokens(t.lower())) for t in texts),
        "n_empty": sum(1 for t in texts if not t.strip()),
        "n_exact_dup_docs": sum(c - 1 for c in cnt.values()),
        "n_dup_groups": sum(1 for c in cnt.values() if c > 1),
    }
    er = _emb(spark, SF_SMOKE).select("vec_id", "label").collect()
    want["n_vectors"] = len(er)
    want["n_labels"] = len({r["label"] for r in er})

    got = {r["metric"]: r["value"] for r in q_dataset_card(spark, SF_SMOKE).collect()}
    assert got == want
    assert got["n_exact_dup_docs"] >= got["n_dup_groups"] * 0
    assert got["n_docs"] > 0 and got["n_tokens"] > 0


def test_roc_auc_matches_pairwise_mann_whitney(spark):
    """Σ area2 over the curve must equal the brute-force doubled
    Mann-Whitney statistic 2·#(p_pos > p_neg) + #(p_pos == p_neg)
    computed over ALL pos×neg pairs in Python (math.exp over the
    trained weights and the engine-computed features — the e3 floor
    absorbs exp ulp).  Also locks: per-score counts, cumulative
    monotonicity, the terminal cum_tp/cum_fp == corpus totals, and
    every area2 slice == n_neg·(2·cum_tp − n_pos)."""
    import math

    from rxtls_spark.queries_training import (
        _logreg_train,
        logreg_features,
        q_roc_auc,
    )
    from tests.conftest import SF_SMOKE

    fx = logreg_features(
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    )
    feats = [(r["x1"], r["x2"], r["x3"], r["y"]) for r in fx.collect()]
    _, wv = _logreg_train(fx)
    scores = []
    for x1, x2, x3, y in feats:
        m = wv[0] * 1.0 + wv[1] * x1 + wv[2] * x2 + wv[3] * x3
        p = 1.0 / (1.0 + math.exp(-m))
        scores.append((math.floor(p * 1000 + 0.5), int(y)))
    pos = sorted(s for s, y in scores if y == 1)
    neg = sorted(s for s, y in scores if y == 0)
    assert pos and neg, "smoke corpus must have both classes"
    u2 = sum(
        2 * sum(1 for sn in neg if sp > sn)
        + sum(1 for sn in neg if sp == sn)
        for sp in pos
    )

    rows = sorted(
        q_roc_auc(spark, SF_SMOKE).collect(),
        key=lambda r: -r["p_e3"],
    )
    # per-score counts match the replica's histogram
    from collections import Counter

    want_pos = Counter(s for s, y in scores if y == 1)
    want_neg = Counter(s for s, y in scores if y == 0)
    assert {r["p_e3"] for r in rows} == set(want_pos) | set(want_neg)
    tp = fp = 0
    total_area2 = 0
    for r in rows:
        assert r["n_pos"] == want_pos.get(r["p_e3"], 0)
        assert r["n_neg"] == want_neg.get(r["p_e3"], 0)
        tp += r["n_pos"]
        fp += r["n_neg"]
        assert (r["cum_tp"], r["cum_fp"]) == (tp, fp), r["p_e3"]
        assert r["area2"] == r["n_neg"] * (2 * r["cum_tp"] - r["n_pos"])
        total_area2 += r["area2"]
    assert (tp, fp) == (len(pos), len(neg))
    assert total_area2 == u2
    # AUC sanity: the trained classifier must rank better than chance
    assert total_area2 > len(pos) * len(neg)


def test_pr_curve_matches_replica_and_pr_contracts(spark):
    """Every pr_curve row must equal the Python replica built from the
    same trained weights (cumulative counts, truncating-DIV
    precision/recall/F1, AP terms), and the PR contracts must hold:
    recall is monotone non-increasing in threshold order read
    bottom-up (non-decreasing in the DESC cum order), the terminal row
    has recall == 1e6 and precision == pos_total/N purity, F1 is the
    harmonic combination of the floored ratios, and step-AP lands in
    (0, 1e6]."""
    import math
    from collections import Counter

    from rxtls_spark.queries_training import (
        _logreg_train,
        logreg_features,
        q_pr_curve,
    )
    from tests.conftest import SF_SMOKE

    fx = logreg_features(
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    )
    feats = [(r["x1"], r["x2"], r["x3"], r["y"]) for r in fx.collect()]
    _, wv = _logreg_train(fx)
    scores = []
    for x1, x2, x3, y in feats:
        m = wv[0] * 1.0 + wv[1] * x1 + wv[2] * x2 + wv[3] * x3
        p = 1.0 / (1.0 + math.exp(-m))
        scores.append((math.floor(p * 1000 + 0.5), int(y)))
    want_pos = Counter(s for s, y in scores if y == 1)
    want_neg = Counter(s for s, y in scores if y == 0)
    pos_total = sum(want_pos.values())
    n_total = len(scores)
    assert pos_total and pos_total < n_total

    rows = sorted(
        q_pr_curve(spark, SF_SMOKE).collect(), key=lambda r: -r["p_e3"]
    )
    assert {r["p_e3"] for r in rows} == set(want_pos) | set(want_neg)
    tp = fp = 0
    ap_sum = 0
    prev_recall = 0
    for r in rows:
        tp += want_pos.get(r["p_e3"], 0)
        fp += want_neg.get(r["p_e3"], 0)
        assert (r["cum_tp"], r["cum_fp"]) == (tp, fp)
        prec = tp * 1000000 // (tp + fp)
        rec = tp * 1000000 // pos_total
        f1 = 2 * tp * 1000000 // (tp + fp + pos_total)
        assert r["precision_e6"] == prec
        assert r["recall_e6"] == rec
        assert r["f1_e6"] == f1
        assert r["ap_term"] == want_pos.get(r["p_e3"], 0) * prec
        assert rec >= prev_recall  # monotone in the cum direction
        prev_recall = rec
        ap_sum += r["ap_term"]
    # terminal operating point: everything kept
    assert rows[-1]["recall_e6"] == 1000000
    assert rows[-1]["precision_e6"] == pos_total * 1000000 // n_total
    ap = ap_sum // pos_total
    assert 0 < ap <= 1000000
    # the trained gate must beat the keep-everything baseline purity
    assert ap > pos_total * 1000000 // n_total


def test_scorer_kappa_matches_replica_and_bounds(spark):
    """Per-source rows must equal the Python replica (same trained
    weights, same AGREE_K knuth sample, same signed truncating-DIV
    kappa), the confusion counts must partition each sample, kappa
    must sit in [-1e6, 1e6], and at least one source must show
    above-chance agreement (the classifier is trained on these
    labels)."""
    import math

    from rxtls_spark.queries_training import (
        AGREE_K,
        KAPPA_PRED_CUT,
        _logreg_train,
        logreg_features,
        q_scorer_kappa,
    )
    from rxtls_spark.functions.hashing import KNUTH_A, KNUTH_P
    from tests.conftest import SF_SMOKE

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    fx = logreg_features(docs)
    _, wv = _logreg_train(fx)
    src = {r["doc_id"]: r["source"] for r in docs.select("doc_id", "source").collect()}
    per_source: dict[str, list[tuple[int, int, int, int]]] = {}
    for r in fx.collect():
        m = wv[0] * 1.0 + wv[1] * r["x1"] + wv[2] * r["x2"] + wv[3] * r["x3"]
        p_e3 = math.floor(1.0 / (1.0 + math.exp(-m)) * 1000 + 0.5)
        h = ((r["doc_id"] % KNUTH_P) * KNUTH_A) % KNUTH_P
        per_source.setdefault(src[r["doc_id"]], []).append(
            (h, r["doc_id"], 1 if p_e3 >= KAPPA_PRED_CUT else 0, int(r["y"]))
        )

    def tdiv(a: int, b: int) -> int:
        q = abs(a) // abs(b)
        return q if (a >= 0) == (b >= 0) else -q

    want = {}
    for s, rows_s in per_source.items():
        keep = sorted(rows_s)[:AGREE_K]
        n = len(keep)
        n11 = sum(1 for _, _, yh, y in keep if yh == 1 and y == 1)
        n10 = sum(1 for _, _, yh, y in keep if yh == 1 and y == 0)
        n01 = sum(1 for _, _, yh, y in keep if yh == 0 and y == 1)
        n00 = sum(1 for _, _, yh, y in keep if yh == 0 and y == 0)
        chance = (n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00)
        den = n * n - chance
        kappa = 0 if den == 0 else tdiv((n * (n11 + n00) - chance) * 1000000, den)
        want[s] = (n, n11, n10, n01, n00, kappa)

    got = {
        r["source"]: (r["n"], r["n11"], r["n10"], r["n01"], r["n00"], r["kappa_e6"])
        for r in q_scorer_kappa(spark, SF_SMOKE).collect()
    }
    assert got == want
    for n, n11, n10, n01, n00, kappa in got.values():
        assert n11 + n10 + n01 + n00 == n
        assert -1000000 <= kappa <= 1000000
    assert any(k[-1] > 0 for k in got.values())


def test_data_scaling_curve_full_fraction_equals_holdout_rollup(spark):
    """The frac=1000 rows must equal a per-source rollup of
    q_lm_eval_holdout's own val+test output (same train set, same
    vocab, same eval docs — the full fraction IS the holdout eval),
    and the eval-set columns (n_eval, sum_bigrams) must be IDENTICAL
    across all three fractions per source — the 'same eval docs, more
    training data' contract that makes the curve readable."""
    from collections import defaultdict

    from rxtls_spark.queries_training import (
        SCALE_FRACS,
        q_data_scaling_curve,
        q_lm_eval_holdout,
    )
    from tests.conftest import SF_SMOKE

    src = {
        r["doc_id"]: r["source"]
        for r in spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .select("doc_id", "source")
        .collect()
    }
    want = defaultdict(lambda: [0, 0, 0, 0, 0])  # n, scored, lp, oov, bg
    for r in q_lm_eval_holdout(spark, SF_SMOKE).collect():
        if r["split"] == "train":
            continue
        w = want[src[r["doc_id"]]]
        w[0] += 1
        if r["avg_logprob"] is not None:
            w[1] += 1
            w[2] += round(r["avg_logprob"] * 1000)
        w[3] += r["n_oov"]
        w[4] += r["n_bigrams"]

    rows = q_data_scaling_curve(spark, SF_SMOKE).collect()
    assert {r["frac_permille"] for r in rows} == set(SCALE_FRACS)
    by_frac = defaultdict(dict)
    for r in rows:
        by_frac[r["frac_permille"]][r["source"]] = r
    full = by_frac[1000]
    assert set(full) == set(want)
    for s, (n, scored, lp, oov, bg) in want.items():
        r = full[s]
        assert (
            r["n_eval"],
            r["n_scored"],
            r["sum_lp_e3"],
            r["sum_oov"],
            r["sum_bigrams"],
        ) == (n, scored, lp, oov, bg), s
    # eval set is FIXED across fractions: only the model moves
    for thr in SCALE_FRACS:
        assert set(by_frac[thr]) == set(full)
        for s, r in by_frac[thr].items():
            assert r["n_eval"] == full[s]["n_eval"]
            assert r["sum_bigrams"] == full[s]["sum_bigrams"]
            assert 0 <= r["n_scored"] <= r["n_eval"]
            assert 0 <= r["sum_oov"] <= r["sum_bigrams"]


def test_soft_dedup_matches_python_replica(spark):
    """Every doc's weight must be exactly 1e6 DIV its exact-text group
    size (full md5-group replica over the injected-dup corpus), and a
    duplicated group's total effective mass must collapse to ~one
    copy's token count (exact whenever dup_count divides 1e6)."""
    import hashlib
    from collections import defaultdict

    from rxtls_spark.operators.dedup import with_injected_dups
    from rxtls_spark.queries_training import _docs, q_soft_dedup
    from tests.conftest import SF_SMOKE

    rows = (
        with_injected_dups(_docs(spark, SF_SMOKE))
        .select("doc_id", "text")
        .collect()
    )
    groups = defaultdict(list)
    n_toks = {}
    for r in rows:
        h = hashlib.md5(r["text"].encode("utf-8")).hexdigest()
        groups[h].append(r["doc_id"])
        n_toks[r["doc_id"]] = len(_ws_tokens(r["text"]))
    expected = {}
    for ids in groups.values():
        root, cnt = min(ids), len(ids)
        w = 1_000_000 // cnt
        for d in ids:
            expected[d] = (root, cnt, w, n_toks[d], n_toks[d] * w)

    got = {
        r["doc_id"]: (
            r["group_root"],
            r["dup_count"],
            r["weight_e6"],
            r["n_tokens"],
            r["eff_tokens_e6"],
        )
        for r in q_soft_dedup(spark, SF_SMOKE).collect()
    }
    assert got == expected
    # the SoftDeDup property: dup groups exist and are down-weighted
    dup_groups = [ids for ids in groups.values() if len(ids) > 1]
    assert dup_groups
    for ids in dup_groups:
        d = ids[0]
        assert got[d][2] == 1_000_000 // len(ids) < 1_000_000


def test_rho_loss_select_matches_python_replica(spark):
    """Full independent replica of the RHO-loss selection: both bigram
    vocabs rebuilt in Python (train-split model + val-split model),
    every scoreable train doc scored under both with the e3 floor,
    and the exact top-RHO_TOPK by (rho DESC, doc_id) must match row
    for row."""
    import math
    import re

    from rxtls_spark.functions.hashing import KNUTH_A, KNUTH_P
    from rxtls_spark.queries_training import (
        BIGRAM_VOCAB_K,
        HOLDOUT_TEST_FROM,
        HOLDOUT_VAL_FROM,
        RHO_TOPK,
        q_rho_loss_select,
    )
    from tests.conftest import SF_SMOKE

    docs = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{SF_SMOKE}/documents.parquet").collect()
    }
    ws = re.compile(r"[ \t\n\x0B\f\r]+")
    toks = {
        d: ws.split(t.strip().lower())
        for d, t in docs.items()
        if t.strip() != ""
    }
    bigrams = {
        d: [f"{t[i]} {t[i + 1]}" for i in range(len(t) - 1)]
        for d, t in toks.items()
    }

    def pm(d):
        return ((d % KNUTH_P) * KNUTH_A) % KNUTH_P % 1000

    def vocab_for(member):
        c2: dict[str, int] = {}
        c1: dict[str, int] = {}
        for d, t in toks.items():
            if not member(pm(d)):
                continue
            for w in t:
                c1[w] = c1.get(w, 0) + 1
            for b in bigrams[d]:
                c2[b] = c2.get(b, 0) + 1
        top = sorted(c2.items(), key=lambda kv: (-kv[1], kv[0]))[
            :BIGRAM_VOCAB_K
        ]
        return {b: math.log(c / c1[b.split(" ")[0]]) for b, c in top}

    v_t = vocab_for(lambda p: p < HOLDOUT_VAL_FROM)
    v_h = vocab_for(
        lambda p: HOLDOUT_VAL_FROM <= p < HOLDOUT_TEST_FROM
    )
    assert v_t and v_h  # both models genuinely trained

    def score(bs, vocab):
        lps = [vocab[b] for b in bs if b in vocab]
        if not lps:
            return None
        s = 0.0
        for x in lps:
            s += x
        return math.floor(s / len(lps) * 1000.0 + 0.5)

    scored = []
    for d, bs in bigrams.items():
        if pm(d) >= HOLDOUT_VAL_FROM:
            continue  # only train docs are selection candidates
        lt, lh = score(bs, v_t), score(bs, v_h)
        if lt is None or lh is None:
            continue
        scored.append((d, int(lt), int(lh), int(lh - lt)))
    scored.sort(key=lambda r: (-r[3], r[0]))
    expected = scored[:RHO_TOPK]

    got = [
        (r["doc_id"], r["lp_train_e3"], r["lp_holdout_e3"], r["rho_e3"])
        for r in q_rho_loss_select(spark, SF_SMOKE)
        .orderBy("rho_e3", "doc_id")
        .collect()
    ]
    got.sort(key=lambda r: (-r[3], r[0]))
    assert got == expected


def test_packing_efficiency_matches_python_replica(spark):
    """Exact-integer replica over the raw parquet: per-ctx doc-bound
    sequence/padding counts from the ceil-division identity, concat
    counts from the token total; also locks the policy-gap invariants
    (doc-bound never beats concat on padding, both shrink as ctx
    shrinks relative to doc length)."""
    from rxtls_spark.queries_training import (
        PACK_CTX_GRID,
        q_packing_efficiency,
    )
    from tests.conftest import SF_SMOKE

    ns = [
        len(_ws_tokens(r["text"]))
        for r in spark.read.parquet(
            f"{SF_SMOKE}/documents.parquet"
        ).collect()
    ]
    ns = [n for n in ns if n > 0]
    expected = {}
    for ctx in PACK_CTX_GRID:
        seqs_doc = sum((n + ctx - 1) // ctx for n in ns)
        pad_doc = sum(((n + ctx - 1) // ctx) * ctx - n for n in ns)
        total = sum(ns)
        expected[ctx] = (
            len(ns),
            total,
            seqs_doc,
            pad_doc,
            (total + ctx - 1) // ctx,
            (ctx - total % ctx) % ctx,
        )

    got = {
        r["ctx"]: (
            r["n_docs"],
            r["total_tokens"],
            r["n_seqs_doc_bound"],
            r["pad_doc_bound"],
            r["n_seqs_concat"],
            r["pad_concat"],
        )
        for r in q_packing_efficiency(spark, SF_SMOKE).collect()
    }
    assert got == expected
    for ctx, (nd, tot, sd, pd, sc, pc) in got.items():
        assert pd >= pc  # doc isolation never pads LESS than concat
        assert sd * ctx == tot + pd
        assert sc * ctx == tot + pc


def test_uncertainty_sample_matches_python_replica(spark):
    """The labeling batch recomputed in Python: e3-floored probability
    under the trained weights (engine-computed features; the floor
    absorbs exp ulp), BIGINT boundary distance |2*p_e3 - 1000|, and
    the (dist ASC, doc_id) top-UNC_K — rows bit-identical.  Also
    locks the semantics: every selected doc is no farther from the
    boundary than every unselected doc."""
    import math

    from rxtls_spark.queries_training import (
        UNC_K,
        _logreg_train,
        logreg_features,
        q_uncertainty_sample,
    )
    from tests.conftest import SF_SMOKE

    fx = logreg_features(
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    )
    feats = {
        r["doc_id"]: (r["x1"], r["x2"], r["x3"], r["y"])
        for r in fx.collect()
    }
    _, wv = _logreg_train(fx)
    rows = {}
    for d, (x1, x2, x3, y) in feats.items():
        m = wv[0] * 1.0 + wv[1] * x1 + wv[2] * x2 + wv[3] * x3
        p_e3 = math.floor(1.0 / (1.0 + math.exp(-m)) * 1000 + 0.5)
        rows[d] = (p_e3, abs(2 * p_e3 - 1000), int(y))
    picked = sorted(rows, key=lambda d: (rows[d][1], d))[:UNC_K]
    want = {d: rows[d] for d in picked}

    got = {
        r["doc_id"]: (r["p_e3"], r["dist_e3"], r["label"])
        for r in q_uncertainty_sample(spark, SF_SMOKE).collect()
    }
    assert got == want
    assert len(got) == UNC_K
    worst_in = max(v[1] for v in got.values())
    best_out = min(
        (rows[d][1] for d in rows if d not in got), default=None
    )
    assert best_out is None or worst_in <= best_out


def test_good_turing_matches_brute_force_spectrum(spark):
    """The full spectrum recomputed with collections.Counter over the
    same lowercased ws-split bigrams: N_r table, r* discounted counts
    and mass bit-identical.  Also locks the Good-Turing identities:
    sum(mass) == total bigram occurrences, and sum over r of
    (r+1)·N_{r+1} == total occurrences minus the max-r class mass."""
    from collections import Counter

    from rxtls_spark.queries_training import q_good_turing
    from tests.conftest import SF_SMOKE

    rows = (
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .select("text")
        .collect()
    )
    bigrams = Counter()
    total = 0
    for r in rows:
        t = r["text"].strip()
        if not t:
            continue
        toks = [w for w in __import__("re").split(
            "[ \t\n\x0b\f\r]+", t.lower()) if w != ""]
        for a, b in zip(toks, toks[1:]):
            bigrams[a + " " + b] += 1
            total += 1
    spec = Counter(bigrams.values())
    want = {}
    for r, n_r in spec.items():
        n_r1 = spec.get(r + 1, 0)
        want[r] = (n_r, (r + 1) * n_r1 * 1000000 // n_r, r * n_r)

    got = {
        row["r"]: (row["n_r"], row["rstar_e6"], row["mass"])
        for row in q_good_turing(spark, SF_SMOKE).collect()
    }
    assert got == want
    assert sum(v[2] for v in got.values()) == total
    assert 1 in got and got[1][0] > 0  # singletons exist -> unseen mass


def test_min_k_prob_matches_python_replica(spark):
    """Independent pure-Python replica of the Min-K% Prob audit:
    tokenize → bigrams → the shared top-K conditional vocab → per-doc
    ASCENDING sort of in-vocab log-probs → mean of the lowest
    ceil(n_in/MINK_DEN), 3-dp stable — every row bit-identical.  Also
    locks the membership-signal direction: mink_score <= the doc's
    overall in-vocab mean (the low tail can never beat the mean)."""
    import math
    import re

    from rxtls_spark.queries_training import (
        BIGRAM_VOCAB_K,
        MINK_DEN,
        q_min_k_prob,
    )
    from tests.conftest import SF_SMOKE

    docs = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{SF_SMOKE}/documents.parquet").collect()
    }
    ws = re.compile(r"[ \t\n\x0B\f\r]+")
    toks = {
        d: ws.split(t.strip().lower())
        for d, t in docs.items()
        if t.strip() != ""
    }
    bigrams = {
        d: [f"{t[i]} {t[i + 1]}" for i in range(len(t) - 1)]
        for d, t in toks.items()
    }
    c2: dict[str, int] = {}
    c1: dict[str, int] = {}
    for t in toks.values():
        for w in t:
            c1[w] = c1.get(w, 0) + 1
    for bs in bigrams.values():
        for b in bs:
            c2[b] = c2.get(b, 0) + 1
    top = sorted(c2.items(), key=lambda kv: (-kv[1], kv[0]))[:BIGRAM_VOCAB_K]
    vocab = {b: math.log(c / c1[b.split(" ")[0]]) for b, c in top}

    out = {r["doc_id"]: r for r in q_min_k_prob(spark, SF_SMOKE).collect()}
    assert set(out) == set(toks)
    for d, bs in bigrams.items():
        lps = sorted(vocab[b] for b in bs if b in vocab)
        r = out[d]
        assert r["n_bigrams"] == len(bs)
        assert r["n_in"] == len(lps)
        if lps:
            k = (len(lps) + MINK_DEN - 1) // MINK_DEN
            assert r["k_used"] == k
            s = 0.0
            for x in lps[:k]:  # sequential fold, Spark's order
                s += x
            want = math.floor(s / k * 1000.0 + 0.5) / 1000.0
            assert r["mink_score"] == want, d
            full = 0.0
            for x in lps:
                full += x
            assert s / k <= full / len(lps) + 1e-12
        else:
            assert r["k_used"] == 0
            assert r["mink_score"] is None


def test_heaps_law_matches_python_replica(spark):
    """Independent pure-Python replica of the Heaps fit: knuth
    permille prefixes, nested type/token counts at every grid
    checkpoint, e3-floored-log integer OLS with truncating signed
    division — rows bit-identical.  Plus the nestedness invariant
    (counts non-decreasing in g) and a sanity band on beta for the
    natural-ish smoke corpus."""
    import math
    import re

    from rxtls_spark.functions.hashing import KNUTH_A, KNUTH_P
    from rxtls_spark.queries_training import HEAPS_GRID, q_heaps_law
    from tests.conftest import SF_SMOKE

    rows = (
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .select("source", "doc_id", "text")
        .collect()
    )
    ws = re.compile(r"[ \t\n\x0B\f\r]+")
    per_src: dict[str, list] = {}
    for r in rows:
        t = r["text"].strip()
        if not t:
            continue
        pm = ((r["doc_id"] % KNUTH_P) * KNUTH_A) % KNUTH_P % 1000
        per_src.setdefault(r["source"], []).append(
            (pm, ws.split(t.lower()))
        )

    def tdiv(a, b):
        q = a // b
        return q + 1 if q < 0 and q * b != a else q

    want = {}
    for src, docs in per_src.items():
        first: dict[str, int] = {}
        for pm, toks in docs:
            for w in toks:
                if w not in first or pm < first[w]:
                    first[w] = pm
        n = {g: sum(len(tk) for pm, tk in docs if pm < g)
             for g in HEAPS_GRID}
        v = {g: sum(1 for mpm in first.values() if mpm < g)
             for g in HEAPS_GRID}
        gs = sorted(HEAPS_GRID)
        assert all(n[a] <= n[b] and v[a] <= v[b]
                   for a, b in zip(gs, gs[1:]))
        k = sx = sy = sxy = sxx = 0
        for g in HEAPS_GRID:
            if n[g] > 0 and v[g] > 0:
                x = math.floor(math.log(float(n[g])) * 1000.0)
                y = math.floor(math.log(float(v[g])) * 1000.0)
                k += 1
                sx += x
                sy += y
                sxy += x * y
                sxx += x * x
        den = k * sxx - sx * sx
        beta = tdiv((k * sxy - sx * sy) * 1000000, den) if den != 0 else 0
        want[src] = (k, n[1000], v[1000], beta)

    got = {
        r["source"]: (r["k"], r["n_full"], r["v_full"], r["beta_e6"])
        for r in q_heaps_law(spark, SF_SMOKE).collect()
    }
    assert got == want
    # the synthetic corpus draws from a closed word list, so beta must
    # sit WELL below 1 (sublinear growth) and above 0
    assert all(0 <= v[3] < 1_000_000 for v in got.values())


def test_gradient_align_matches_python_replica(spark):
    """The full LESS-style chain recomputed in Python: permille
    splits, the val-mean gradient with the exact 6-dp floor, the
    fixed-order alignment fold, e3-floored scores and the (score
    DESC, doc_id) top-GRAD_K — rows bit-identical.  Plus the
    direction invariant: every selected alignment >= every
    unselected one."""
    import math

    from rxtls_spark.functions.hashing import KNUTH_A, KNUTH_P
    from rxtls_spark.queries_training import (
        GRAD_K,
        HOLDOUT_TEST_FROM,
        HOLDOUT_VAL_FROM,
        _logreg_train,
        logreg_features,
        q_gradient_align,
    )
    from tests.conftest import SF_SMOKE

    fx = logreg_features(
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    )
    feats = {
        r["doc_id"]: (r["x1"], r["x2"], r["x3"], r["y"])
        for r in fx.collect()
    }
    _, wv = _logreg_train(fx)

    def resid(x1, x2, x3, y):
        m = wv[0] * 1.0 + wv[1] * x1 + wv[2] * x2 + wv[3] * x3
        return 1.0 / (1.0 + math.exp(-m)) - y

    def pm(d):
        return ((d % KNUTH_P) * KNUTH_A) % KNUTH_P % 1000

    val = [d for d in feats
           if HOLDOUT_VAL_FROM <= pm(d) < HOLDOUT_TEST_FROM]
    assert val, "smoke corpus must have val docs"
    gv = []
    for j in range(4):
        s = 0.0
        for d in sorted(val):
            x1, x2, x3, y = feats[d]
            xj = (1.0, x1, x2, x3)[j]
            s += resid(x1, x2, x3, y) * xj
        gv.append(math.floor(s / len(val) * 1000000 + 0.5) / 1000000)

    scores = {}
    for d, (x1, x2, x3, y) in feats.items():
        if pm(d) >= HOLDOUT_VAL_FROM:
            continue
        dot = gv[0] * 1.0 + gv[1] * x1 + gv[2] * x2 + gv[3] * x3
        scores[d] = (
            math.floor(resid(x1, x2, x3, y) * dot * 1000 + 0.5),
            int(y),
        )
    picked = sorted(scores, key=lambda d: (-scores[d][0], d))[:GRAD_K]
    want = {d: scores[d] for d in picked}

    got = {
        r["doc_id"]: (r["align_e3"], r["label"])
        for r in q_gradient_align(spark, SF_SMOKE).collect()
    }
    assert got == want
    assert len(got) == GRAD_K
    worst_in = min(v[0] for v in got.values())
    rest = [scores[d][0] for d in scores if d not in got]
    assert not rest or worst_in >= max(rest)


def test_fim_transform_matches_python_replica(spark):
    """The whole FIM surgery recomputed in Python: permille gate,
    knuth cut points with the equal-draw widen rule, PSM reorder and
    its md5 — rows bit-identical.  Plus the reconstruction invariant:
    the three splits partition the token stream exactly, so
    re-assembling middle into the gap restores the original."""
    import hashlib
    import re

    from rxtls_spark.functions.hashing import KNUTH_A, KNUTH_P
    from rxtls_spark.queries_training import (
        FIM_MID,
        FIM_PRE,
        FIM_RATE,
        FIM_SUF,
        q_fim_transform,
    )
    from tests.conftest import SF_SMOKE

    rows = (
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    )
    ws = re.compile(r"[ \t\n\x0B\f\r]+")

    def kh(v):
        return ((v % KNUTH_P) * KNUTH_A) % KNUTH_P

    want = {}
    n_fim = 0
    for r in rows:
        txt = r["text"].strip()
        if not txt:
            continue
        d = r["doc_id"]
        t = ws.split(txt.lower())
        n = len(t)
        if kh(d) % 1000 < FIM_RATE and n >= 3:
            n_fim += 1
            c1, c2 = kh(d) % (n - 1), kh(2 * d + 1) % (n - 1)
            lo = min(c1, c2) + 1
            hi = max(c1, c2) + 1
            if hi == lo:
                hi += 1
            pre, mid, suf = t[:lo], t[lo:hi], t[hi:]
            assert pre + mid + suf == t  # exact partition
            out = " ".join([FIM_PRE] + pre + [FIM_SUF] + suf
                           + [FIM_MID] + mid)
            want[d] = (1, lo, hi - lo, n - hi,
                       hashlib.md5(out.encode()).hexdigest())
        else:
            want[d] = (0, 0, 0, n,
                       hashlib.md5(" ".join(t).encode()).hexdigest())

    got = {
        r["doc_id"]: (r["fim"], r["n_pre"], r["n_mid"], r["n_suf"],
                      r["out_md5"])
        for r in q_fim_transform(spark, SF_SMOKE).collect()
    }
    assert got == want
    assert n_fim > 0 and n_fim < len(want)  # both branches exercised


def test_edit_verify_distance_identities(spark):
    """Locks the provable Levenshtein identities per variant on the
    real smoke pool: append → d == 7 exactly; sub → d == #'a'
    (substitutions only); half → d == n − n//2 (deletions only);
    rev → d from a brute-force DP replica.  And sim_e5 is the exact
    integer identity on every row."""
    from rxtls_spark.queries_training import q_edit_verify
    from tests.conftest import SF_SMOKE

    texts = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .where("doc_id % 20 = 0 AND trim(text) <> ''")
        .collect()
    }

    def lev(a, b):
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[-1] + 1,
                               prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    rows = q_edit_verify(spark, SF_SMOKE).collect()
    assert len(rows) == 4 * len(texts)
    for r in rows:
        a = texts[r["doc_id"]]
        assert r["len_a"] == len(a)
        if r["variant"] == "append":
            assert r["d"] == 7 and r["len_b"] == len(a) + 7
        elif r["variant"] == "sub":
            assert r["d"] == a.count("a") and r["len_b"] == len(a)
        elif r["variant"] == "half":
            assert r["d"] == len(a) - len(a) // 2
            assert r["len_b"] == len(a) // 2
        else:
            assert r["variant"] == "rev"
            assert r["d"] == lev(a, a[::-1])
        mx = max(r["len_a"], r["len_b"])
        assert r["sim_e5"] == (mx - r["d"]) * 100000 // mx


def test_split_leakage_matches_python_replica(spark):
    """Exact replica over the smoke corpus: permille splits, distinct
    word-3-gram shingle sets, per-eval-doc distinct train-doc and
    compromised-shingle counts — rows bit-identical.  The synthetic
    corpus draws from a closed word list, so leakage rows MUST exist
    (shared shingles across the boundary are guaranteed)."""
    import re

    from rxtls_spark.functions.hashing import KNUTH_A, KNUTH_P
    from rxtls_spark.queries_training import (
        HOLDOUT_TEST_FROM,
        HOLDOUT_VAL_FROM,
        q_split_leakage,
    )
    from tests.conftest import SF_SMOKE

    rows = (
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    )
    ws = re.compile(r"[ \t\n\x0B\f\r]+")

    def shingles(t):
        w = ws.split(t.strip().lower())
        if len(w) >= 3:
            return {" ".join(w[i:i + 3]) for i in range(len(w) - 2)}
        return {" ".join(w)}

    ev, tr_by_shingle = {}, {}
    for r in rows:
        if r["text"].strip() == "":
            continue
        pm = ((r["doc_id"] % KNUTH_P) * KNUTH_A) % KNUTH_P % 1000
        sh = shingles(r["text"])
        if pm >= HOLDOUT_VAL_FROM:
            split = "test" if pm >= HOLDOUT_TEST_FROM else "val"
            ev[r["doc_id"]] = (split, sh)
        else:
            for s in sh:
                tr_by_shingle.setdefault(s, set()).add(r["doc_id"])

    want = {}
    for d, (split, sh) in ev.items():
        docs = set()
        shared = set()
        for s in sh:
            hits = tr_by_shingle.get(s)
            if hits:
                docs |= hits
                shared.add(s)
        if shared:
            want[(d, split)] = (len(docs), len(shared))

    got = {
        (r["doc_id"], r["split"]): (r["n_train_docs"],
                                    r["n_shared_shingles"])
        for r in q_split_leakage(spark, SF_SMOKE).collect()
    }
    assert got == want
    assert got, "closed-vocab corpus must leak across the boundary"
    assert {s for _, s in got} <= {"val", "test"}


def test_cartography_matches_python_replica(spark):
    """Data-map rows recomputed in Python over the engine-computed
    features and the shared GD checkpoint weights: per-checkpoint
    e3-floored true-label probability (the floor absorbs exp ulp),
    all-BIGINT conf_sum / mean / variance numerator, and the mirrored
    region CASE — every row bit-identical.  Also locks the identities
    var_num >= 0, mean_e3 == conf_sum DIV T in [0, 1000], and that
    the smoke corpus populates more than one region."""
    import math

    from rxtls_spark.queries_training import (
        CARTO_HI_E3,
        CARTO_LO_E3,
        CARTO_SD_E3,
        LOGREG_ITERS,
        _logreg_train,
        logreg_features,
        q_cartography,
    )
    from tests.conftest import SF_SMOKE

    fx = logreg_features(
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    )
    feats = {
        r["doc_id"]: (r["x1"], r["x2"], r["x3"], r["y"])
        for r in fx.collect()
    }
    steps, _ = _logreg_train(fx)
    wvs = {}
    for it, j, w, _loss in steps:
        wvs.setdefault(it, [0.0] * 4)[j] = w

    t = LOGREG_ITERS
    thr = t * t * CARTO_SD_E3 * CARTO_SD_E3
    want = {}
    for d, (x1, x2, x3, y) in feats.items():
        xs = []
        for it in range(1, t + 1):
            wv = wvs[it]
            m = wv[0] * 1.0 + wv[1] * x1 + wv[2] * x2 + wv[3] * x3
            p = 1.0 / (1.0 + math.exp(-m))
            pt = p if y == 1.0 else 1.0 - p
            xs.append(math.floor(pt * 1000 + 0.5))
        s, sq = sum(xs), sum(x * x for x in xs)
        var_num = t * sq - s * s
        mean = s // t
        region = (
            "ambiguous"
            if var_num >= thr
            else "easy"
            if mean >= CARTO_HI_E3
            else "hard"
            if mean < CARTO_LO_E3
            else "mid"
        )
        want[d] = (int(y), s, mean, var_num, region)

    got = {
        r["doc_id"]: (
            r["label"],
            r["conf_sum_e3"],
            r["mean_e3"],
            r["var_num"],
            r["region"],
        )
        for r in q_cartography(spark, SF_SMOKE).collect()
    }
    assert got == want
    for label, s, mean, var_num, _region in got.values():
        assert var_num >= 0
        assert 0 <= mean <= 1000
        assert mean == s // LOGREG_ITERS
        assert label in (0, 1)
    assert len({v[4] for v in got.values()}) > 1


def test_stupid_backoff_matches_python_replica(spark):
    """Per-doc Stupid-Backoff rows recomputed with collections.Counter
    vocabs (same top-K tie rules, e3-floored ln terms, coalesce
    direct-over-backoff, signed truncating-DIV mean) — bit-identical.
    Also locks n_direct + n_backoff + n_oov == n_bigrams and that the
    scoring plan is a pure map (no Exchange, no Python UDF)."""
    import math
    import re
    from collections import Counter

    from rxtls_spark.plans.checks import plan_string
    from rxtls_spark.queries_training import (
        BIGRAM_VOCAB_K,
        SB_ALPHA_DEN,
        SB_ALPHA_NUM,
        SB_UNI_K,
        q_stupid_backoff,
    )
    from tests.conftest import SF_SMOKE

    df = q_stupid_backoff(spark, SF_SMOKE)
    plan = plan_string(df, mode="simple")
    assert "Exchange" not in plan, plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    got = {r["doc_id"]: r for r in df.collect()}

    ws = re.compile(r"[ \t\n\x0B\f\r]+")
    texts = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .select("doc_id", "text")
        .collect()
        if r["text"].strip() != ""
    }
    toks = {d: ws.split(t.strip().lower()) for d, t in texts.items()}
    bgs = {
        d: [f"{a} {b}" for a, b in zip(t, t[1:])] for d, t in toks.items()
    }
    c2 = Counter(b for bb in bgs.values() for b in bb)
    top_bg = sorted(c2.items(), key=lambda kv: (-kv[1], kv[0]))[
        :BIGRAM_VOCAB_K
    ]
    c1 = Counter(w for t in toks.values() for w in t)
    bg_map = {
        b: math.floor(math.log(c / c1[b.split(" ")[0]]) * 1000)
        for b, c in top_bg
    }
    n_total = sum(c1.values())
    uni_map = {
        w: math.floor(
            math.log((SB_ALPHA_NUM * c) / (SB_ALPHA_DEN * n_total)) * 1000
        )
        for w, c in sorted(c1.items(), key=lambda kv: (-kv[1], kv[0]))[
            :SB_UNI_K
        ]
    }

    def tdiv(a: int, b: int) -> int:
        q = abs(a) // abs(b)
        return q if (a >= 0) == (b >= 0) else -q

    assert set(got) == set(texts)
    for d, bb in bgs.items():
        nd = nb = 0
        s = 0
        for b in bb:
            if b in bg_map:
                nd += 1
                s += bg_map[b]
            elif b.split(" ")[1] in uni_map:
                nb += 1
                s += uni_map[b.split(" ")[1]]
        r = got[d]
        assert r["n_bigrams"] == len(bb), d
        assert (r["n_direct"], r["n_backoff"]) == (nd, nb), d
        assert r["n_oov"] == len(bb) - nd - nb, d
        assert r["score_sum_e3"] == s, d
        want_mean = tdiv(s, nd + nb) if nd + nb > 0 else None
        assert r["mean_e3"] == want_mean, d
        assert r["n_direct"] + r["n_backoff"] + r["n_oov"] == r["n_bigrams"]
    assert any(r["n_backoff"] > 0 for r in got.values())
    assert any(r["n_direct"] > 0 for r in got.values())


def test_k_anonymity_matches_python_replica(spark):
    """QI equivalence classes recomputed in Python (same knuth author
    cohort, length bucket, CASE order) — bit-identical; also locks
    the audit semantics: every group verdict follows the k-then-l
    precedence, suppress_k groups are all smaller than K_ANON, and
    group sizes sum to the corpus."""
    from rxtls_spark.functions.hashing import KNUTH_A, KNUTH_P
    from rxtls_spark.queries_training import (
        K_ANON,
        KANON_AUTHORS,
        KANON_LEN_BUCKET,
        L_DIV,
        q_k_anonymity,
    )
    from tests.conftest import SF_SMOKE

    got = {
        (r["source"], r["lang"], r["len_bucket"]): (
            r["n_docs"],
            r["n_authors"],
            r["verdict"],
        )
        for r in q_k_anonymity(spark, SF_SMOKE).collect()
    }
    rows = (
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .select("doc_id", "source", "lang", "n_chars")
        .collect()
    )
    groups: dict[tuple, list[int]] = {}
    for r in rows:
        qi = (r["source"], r["lang"], r["n_chars"] // KANON_LEN_BUCKET)
        author = ((r["doc_id"] % KNUTH_P) * KNUTH_A) % KNUTH_P % KANON_AUTHORS
        groups.setdefault(qi, []).append(author)
    assert set(got) == set(groups)
    for qi, authors in groups.items():
        n, na = len(authors), len(set(authors))
        verdict = (
            "suppress_k"
            if n < K_ANON
            else "suppress_l"
            if na < L_DIV
            else "ok"
        )
        assert got[qi] == (n, na, verdict), qi
    assert sum(v[0] for v in got.values()) == len(rows)
    assert len({v[2] for v in got.values()}) > 1


def test_brier_decomp_matches_python_replica(spark):
    """Reliability/resolution terms recomputed in Python from the
    engine-computed features and trained weights (e3-floored p, the
    truncating-DIV bin/base rates) — bit-identical.  Also locks the
    Murphy-decomposition sanity: rel/res terms are non-negative and
    bin sizes sum to the corpus."""
    import math

    from rxtls_spark.queries_training import (
        CALIB_BINS,
        _logreg_train,
        logreg_features,
        q_brier_decomp,
    )
    from tests.conftest import SF_SMOKE

    fx = logreg_features(
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    )
    feats = [
        (r["x1"], r["x2"], r["x3"], r["y"]) for r in fx.collect()
    ]
    _, wv = _logreg_train(fx)
    per_bin: dict[int, list[tuple[int, int, int]]] = {}
    for x1, x2, x3, y in feats:
        m = wv[0] * 1.0 + wv[1] * x1 + wv[2] * x2 + wv[3] * x3
        p = 1.0 / (1.0 + math.exp(-m))
        p_e3 = math.floor(p * 1000 + 0.5)
        err_e3 = math.floor(abs(p - y) * 1000 + 0.5)
        b = min(p_e3 // 100, CALIB_BINS - 1)
        per_bin.setdefault(b, []).append((p_e3, err_e3, int(y)))
    n_all = len(feats)
    obar = 1000 * sum(y for rows in per_bin.values() for _, _, y in rows) // n_all
    want = {}
    for b, rows in per_bin.items():
        n = len(rows)
        n_pos = sum(y for _, _, y in rows)
        pbar = sum(p for p, _, _ in rows) // n
        obar_b = (1000 * n_pos) // n
        want[b] = (
            n,
            n_pos,
            pbar,
            obar_b,
            sum(e * e for _, e, _ in rows),
            n * (pbar - obar_b) ** 2,
            n * (obar_b - obar) ** 2,
        )
    got = {
        r["bin"]: (
            r["n"],
            r["n_pos"],
            r["pbar_e3"],
            r["obar_bin_e3"],
            r["sum_err2_e6"],
            r["rel_term"],
            r["res_term"],
        )
        for r in q_brier_decomp(spark, SF_SMOKE).collect()
    }
    assert got == want
    assert sum(v[0] for v in got.values()) == n_all
    for v in got.values():
        assert v[5] >= 0 and v[6] >= 0


def test_tracin_influence_matches_python_replica(spark):
    """Trajectory-summed influence recomputed in Python: per GD
    checkpoint the 6-dp floor-stable val-mean gradient and the
    e3-floored alignment term, summed — bit-identical per train doc.
    Also locks: only train-slice docs appear, and the final
    checkpoint's term ordering correlates with gradient_align (the
    final-term ranking equals gradient_align's align_e3 on shared
    docs)."""
    import math

    from rxtls_spark.functions.hashing import KNUTH_A, KNUTH_P
    from rxtls_spark.queries_training import (
        HOLDOUT_TEST_FROM,
        HOLDOUT_VAL_FROM,
        LOGREG_ITERS,
        _logreg_train,
        logreg_features,
        q_tracin_influence,
    )
    from tests.conftest import SF_SMOKE

    fx = logreg_features(
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    )
    feats = {
        r["doc_id"]: (r["x1"], r["x2"], r["x3"], r["y"])
        for r in fx.collect()
    }
    steps, _ = _logreg_train(fx)
    wvs = {}
    for it, j, w, _loss in steps:
        wvs.setdefault(it, [0.0] * 4)[j] = w

    def pm(d):
        return ((d % KNUTH_P) * KNUTH_A) % KNUTH_P % 1000

    val = [
        d
        for d in feats
        if HOLDOUT_VAL_FROM <= pm(d) < HOLDOUT_TEST_FROM
    ]
    assert val, "smoke corpus must have val docs"
    want = {}
    terms_by_doc = {d: [] for d in feats}
    for t in range(1, LOGREG_ITERS + 1):
        wv = wvs[t]
        ps = {}
        for d, (x1, x2, x3, y) in feats.items():
            m = wv[0] * 1.0 + wv[1] * x1 + wv[2] * x2 + wv[3] * x3
            ps[d] = 1.0 / (1.0 + math.exp(-m))
        gv = []
        for j, getx in enumerate(
            [lambda f: 1.0, lambda f: f[0], lambda f: f[1], lambda f: f[2]]
        ):
            s = sum((ps[d] - feats[d][3]) * getx(feats[d]) for d in val)
            gv.append(math.floor(s / len(val) * 1e6 + 0.5) / 1e6)
        for d, (x1, x2, x3, y) in feats.items():
            dot = gv[0] * 1.0 + gv[1] * x1 + gv[2] * x2 + gv[3] * x3
            terms_by_doc[d].append(
                math.floor((ps[d] - y) * dot * 1000 + 0.5)
            )
    for d, (x1, x2, x3, y) in feats.items():
        if pm(d) < HOLDOUT_VAL_FROM:
            want[d] = (sum(terms_by_doc[d]), int(y))

    got = {
        r["doc_id"]: (r["influence_e3"], r["label"])
        for r in q_tracin_influence(spark, SF_SMOKE).collect()
    }
    assert got == want
    assert len({v[0] for v in got.values()}) > 1


def test_conformal_coverage_matches_python_replica(spark):
    """Split-conformal rows recomputed in Python (same BIGINT
    conformity score on the floored p_e3, integer-ceil rank k, exact
    histogram qhat, k > n_val guard) — bit-identical.  Also locks the
    finite-sample guarantee the method exists for: val coverage
    >= (1-alpha) permille."""
    import math

    from rxtls_spark.functions.hashing import KNUTH_A, KNUTH_P
    from rxtls_spark.queries_training import (
        CONF_ALPHA_DEN,
        CONF_ALPHA_NUM,
        HOLDOUT_TEST_FROM,
        HOLDOUT_VAL_FROM,
        _logreg_train,
        logreg_features,
        q_conformal_coverage,
    )
    from tests.conftest import SF_SMOKE

    fx = logreg_features(
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    )
    feats = {
        r["doc_id"]: (r["x1"], r["x2"], r["x3"], r["y"])
        for r in fx.collect()
    }
    _, wv = _logreg_train(fx)
    by_split: dict[str, list[int]] = {"val": [], "test": []}
    for d, (x1, x2, x3, y) in feats.items():
        pm = ((d % KNUTH_P) * KNUTH_A) % KNUTH_P % 1000
        if pm < HOLDOUT_VAL_FROM:
            continue
        split = "test" if pm >= HOLDOUT_TEST_FROM else "val"
        m = wv[0] * 1.0 + wv[1] * x1 + wv[2] * x2 + wv[3] * x3
        p_e3 = math.floor(1.0 / (1.0 + math.exp(-m)) * 1000 + 0.5)
        by_split[split].append(abs(p_e3 - 1000 * int(y)))
    n_val = len(by_split["val"])
    assert n_val > 0 and by_split["test"]
    keep = CONF_ALPHA_DEN - CONF_ALPHA_NUM
    k = ((n_val + 1) * keep + CONF_ALPHA_DEN - 1) // CONF_ALPHA_DEN
    qhat = sorted(by_split["val"])[k - 1] if k <= n_val else 1000
    want = {}
    for split, ss in by_split.items():
        nc = sum(1 for x in ss if x <= qhat)
        want[split] = (len(ss), nc, (nc * 1000) // len(ss), qhat)

    got = {
        r["split"]: (
            r["n"],
            r["n_covered"],
            r["covered_permille"],
            r["qhat"],
        )
        for r in q_conformal_coverage(spark, SF_SMOKE).collect()
    }
    assert got == want
    assert got["val"][2] >= 1000 * keep // CONF_ALPHA_DEN


def test_psi_drift_matches_python_replica(spark):
    """Per-source PSI recomputed in Python over engine-computed
    quality scores (same exact-integer buckets, knuth parity slices,
    +1-smoothed clamped e9 shares, e3-floored log-ratio terms) —
    bit-identical.  Self-drift between random halves must be small:
    |psi_e12| well under the 0.1-PSI alert line for every source."""
    import math

    from rxtls_spark.functions.hashing import KNUTH_A, KNUTH_P
    from rxtls_spark.functions.text import quality_score
    from rxtls_spark.queries_training import (
        PSI_SHARE_SCALE,
        q_psi_drift,
    )
    from tests.conftest import SF_SMOKE

    import pyspark.sql.functions as F

    scored = (
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .select("doc_id", "source", quality_score().alias("quality"))
        .collect()
    )
    cnts: dict[str, dict[int, list[int]]] = {}
    for r in scored:
        qb = math.floor(r["quality"] * 100000 + 0.5) // 100
        sl = ((r["doc_id"] % KNUTH_P) * KNUTH_A) % KNUTH_P % 2
        c = cnts.setdefault(r["source"], {}).setdefault(qb, [0, 0])
        c[sl] += 1
    want = {}
    for src, buckets in cnts.items():
        n_a = sum(v[0] for v in buckets.values())
        n_b = sum(v[1] for v in buckets.values())
        nb = len(buckets)
        psi = 0
        for c_a, c_b in buckets.values():
            s_a = max(((c_a + 1) * PSI_SHARE_SCALE) // (n_a + nb), 1)
            s_b = max(((c_b + 1) * PSI_SHARE_SCALE) // (n_b + nb), 1)
            psi += (s_a - s_b) * math.floor(math.log(s_a / s_b) * 1000)
        want[src] = (n_a, n_b, nb, psi)
    got = {
        r["source"]: (r["n_a"], r["n_b"], r["n_buckets"], r["psi_e12"])
        for r in q_psi_drift(spark, SF_SMOKE).collect()
    }
    assert got == want
    for src, (_, _, _, psi) in got.items():
        assert psi >= 0, src


def test_source_keyness_matches_python_replica(spark):
    """Keyness table recomputed with Counters (same top-K candidate
    vocab tie rule, the one-expression double-cast PMI e3 floor, the
    (pmi DESC, tok) per-source ranks) — bit-identical.  Also locks:
    exactly <= KEY_TOPK rows per source with dense ranks 1..k, and a
    positive-PMI token exists (sources do have characteristic
    vocabulary in the synthetic corpus)."""
    import math
    import re
    from collections import Counter

    from rxtls_spark.queries_training import (
        KEY_TOPK,
        KEY_VOCAB_K,
        q_source_keyness,
    )
    from tests.conftest import SF_SMOKE

    ws = re.compile(r"[ \t\n\x0B\f\r]+")
    rows = (
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .select("source", "text")
        .collect()
    )
    c_t: Counter = Counter()
    c_st: Counter = Counter()
    c_s: Counter = Counter()
    for r in rows:
        t = r["text"].strip()
        if not t:
            continue
        for tok in ws.split(t.lower()):
            c_t[tok] += 1
            c_st[(r["source"], tok)] += 1
            c_s[r["source"]] += 1
    n = sum(c_t.values())
    vocab = {
        tok
        for tok, _ in sorted(c_t.items(), key=lambda kv: (-kv[1], kv[0]))[
            :KEY_VOCAB_K
        ]
    }
    per_source: dict[str, list] = {}
    for (src, tok), cst in c_st.items():
        if tok not in vocab:
            continue
        pmi = math.floor(
            math.log(
                (float(cst) * float(n))
                / (float(c_s[src]) * float(c_t[tok]))
            )
            * 1000
        )
        per_source.setdefault(src, []).append((-pmi, tok, cst))
    want = {}
    for src, items in per_source.items():
        items.sort()
        for rk, (negpmi, tok, cst) in enumerate(items[:KEY_TOPK], 1):
            want[(src, tok)] = (cst, c_t[tok], -negpmi, rk)

    got = {
        (r["source"], r["tok"]): (
            r["c_st"],
            r["c_t"],
            r["pmi_e3"],
            r["rank"],
        )
        for r in q_source_keyness(spark, SF_SMOKE).collect()
    }
    assert got == want
    by_src: dict[str, list] = {}
    for (src, _), v in got.items():
        by_src.setdefault(src, []).append(v[3])
    for src, rks in by_src.items():
        assert sorted(rks) == list(range(1, len(rks) + 1)), src
        assert len(rks) <= KEY_TOPK
    assert any(v[2] > 0 for v in got.values())


def test_quality_outliers_matches_python_replica(spark):
    """Per-source med2/mad4/outlier counts recomputed from the raw
    per-doc e5 quality integers (true doc-level doubled medians via
    sorting — proving the bounded-histogram cum-crossing recovery is
    EXACTLY the doc-level statistic, not an approximation) —
    bit-identical.  Sanity: med2 is twice a real median (between 2·min
    and 2·max), mad4 >= 0, outliers < half the source."""
    import math

    from rxtls_spark.functions.text import quality_score
    from rxtls_spark.queries_training import OUT_Z_E3, q_quality_outliers
    from tests.conftest import SF_SMOKE

    scored = (
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .select("source", quality_score().alias("quality"))
        .collect()
    )
    by_src: dict[str, list[int]] = {}
    for r in scored:
        by_src.setdefault(r["source"], []).append(
            math.floor(r["quality"] * 100000 + 0.5)
        )

    def med2(vals: list[int]) -> int:
        v = sorted(vals)
        n = len(v)
        return v[(n + 1) // 2 - 1] + v[(n + 2) // 2 - 1]

    want = {}
    for src, vals in by_src.items():
        m2 = med2(vals)
        devs = [abs(2 * x - m2) for x in vals]
        # doubled median of the doubled deviations == 4*MAD
        m4 = med2(devs)
        n_out = sum(
            1
            for x in vals
            if (abs(2 * x - m2) * 2000) // max(m4, 1) >= OUT_Z_E3
        )
        want[src] = (len(vals), m2, m4, n_out)

    got = {
        r["source"]: (r["n"], r["med2_e5"], r["mad4_e5"], r["n_outliers"])
        for r in q_quality_outliers(spark, SF_SMOKE).collect()
    }
    assert got == want
    for src, vals in by_src.items():
        n, m2, m4, n_out = got[src]
        assert 2 * min(vals) <= m2 <= 2 * max(vals)
        assert m4 >= 0
        assert n_out <= n // 2, src


def test_readability_matches_python_replica(spark):
    """Coleman-Liau rows recomputed in Python (re counts with the
    identical ASCII classes, the same truncating DIV chain) —
    bit-identical.  Sanity: n_sents >= 1, letters <= chars, and CLI
    increases with letters-per-word on a controlled pair."""
    import re

    from rxtls_spark.queries_training import (
        CLI_BIAS_E4,
        CLI_L_NUM,
        CLI_S_NUM,
        q_readability,
    )
    from tests.conftest import SF_SMOKE

    ws = re.compile(r"[ \t\n\x0B\f\r]+")
    sent = re.compile(r"[.!?]+([ \t\n\x0B\f\r]+|$)")
    notletter = re.compile(r"[^A-Za-z]")

    def tdiv(a, b):
        q = abs(a) // abs(b)
        return q if (a >= 0) == (b >= 0) else -q

    texts = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .select("doc_id", "text")
        .collect()
        if r["text"].strip() != ""
    }
    want = {}
    for d, t in texts.items():
        n_words = len(ws.split(t.strip().lower()))
        n_letters = len(notletter.sub("", t))
        n_sents = max(len(sent.findall(t)), 1)
        l100 = (n_letters * 100000) // n_words
        s100 = (n_sents * 100000) // n_words
        cli = (
            tdiv(CLI_L_NUM * l100, 1000)
            - tdiv(CLI_S_NUM * s100, 1000)
            - CLI_BIAS_E4
        )
        want[d] = (n_words, n_letters, n_sents, l100, s100, cli)
    got = {
        r["doc_id"]: (
            r["n_words"],
            r["n_letters"],
            r["n_sents"],
            r["l100_e3"],
            r["s100_e3"],
            r["cli_e4"],
        )
        for r in q_readability(spark, SF_SMOKE).collect()
    }
    assert got == want
    for d, t in texts.items():
        assert got[d][2] >= 1
        assert got[d][1] <= len(t)
    assert len({v[5] for v in got.values()}) > 1


def test_source_gini_matches_python_replica(spark):
    """Gini recomputed from the raw sorted per-source length lists
    (the classic rank formula) — proving the histogram run-position
    form equals the sorted-rank statistic exactly, ties included.
    Sanity: 0 <= gini_e6 < 1e6, and an equal-length source would be
    ~0 (checked via a constructed all-equal multiset)."""
    from rxtls_spark.queries_training import q_source_gini
    from tests.conftest import SF_SMOKE

    got = {
        r["source"]: (r["n"], r["total_chars"], r["gini_e6"])
        for r in q_source_gini(spark, SF_SMOKE).collect()
    }
    rows = (
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .select("source", "n_chars")
        .collect()
    )
    by_src: dict[str, list[int]] = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append(r["n_chars"])

    def gini_e6(vals: list[int]) -> int:
        v = sorted(vals)
        n = len(v)
        s0 = sum(v)
        s1 = sum(i * x for i, x in enumerate(v, 1))
        return (2 * s1 * 1000000) // (n * s0) - ((n + 1) * 1000000) // n

    want = {
        src: (len(v), sum(v), gini_e6(v)) for src, v in by_src.items()
    }
    assert got == want
    for src, (_, _, g) in got.items():
        assert 0 <= g < 1_000_000, src
    assert gini_e6([7, 7, 7, 7]) == 0
    assert gini_e6([0, 0, 0, 100]) > 700_000


def test_source_gini_no_overflow_at_web_scale(spark):
    """r6 overflow fix (VERDICT item 2): the DECIMAL(38,0) S1/final
    form must survive a 10^10-doc source where c·p ~ 1e20 and even
    c·(c+1)/2 ~ 5e19 exceed BIGINT — ANSI mode would raise, so plain
    row equality against the exact-int Python replica is the proof."""
    from fractions import Fraction

    from rxtls_spark.queries_training import _gini_from_hist

    # one source, two length runs of 5e9 docs each: p for the second
    # run is 5e9, c·p = 2.5e19 > 2^63; tri(c) ≈ 1.25e19 > 2^63
    c = 5_000_000_000
    rows = [("big", 1_000, c), ("big", 1_000_000, c)]
    hist = spark.createDataFrame(rows, "source string, v long, c long")
    got = _gini_from_hist(hist).collect()
    assert len(got) == 1
    n = 2 * c
    s0 = 1_000 * c + 1_000_000 * c
    s1 = 1_000 * (c * 0 + c * (c + 1) // 2) + 1_000_000 * (
        c * c + c * (c + 1) // 2
    )
    want_gini = int(
        Fraction(2 * s1 * 1_000_000, n * s0).__floor__()
        - ((n + 1) * 1_000_000) // n
    )
    r = got[0]
    assert (r["source"], r["n"], r["total_chars"], r["gini_e6"]) == (
        "big", n, s0, want_gini
    )


def test_script_profile_matches_python_replica(spark):
    """Script counts recomputed with Python re (the \\x{...} classes
    translated to \\uXXXX — same codepoint ranges), the mirrored
    dominant CASE order and truncating permille — bit-identical.
    Sanity: counts never exceed n_chars; the synthetic corpus is
    ASCII (even its 'zh' docs use romanized marker tokens — cjk
    counts are zero and the replica equality proves both engines
    agree on that), so latin must dominate every doc with a
    positive share."""
    import re

    from rxtls_spark.queries_training import (
        SCRIPT_CLASSES,
        q_script_profile,
    )
    from tests.conftest import SF_SMOKE

    def to_py(pat: str) -> str:
        return re.sub(
            r"\\x\{([0-9A-Fa-f]+)\}",
            lambda m: "\\u" + m.group(1).zfill(4),
            pat,
        )

    classes = [(n, re.compile(to_py(p))) for n, p in SCRIPT_CLASSES]
    texts = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .select("doc_id", "text")
        .collect()
        if r["text"].strip() != ""
    }
    want = {}
    for d, t in texts.items():
        counts = [(n, len(p.findall(t))) for n, p in classes]
        m = max(c for _, c in counts)
        dom = "none" if m == 0 else next(
            n for n, c in counts if c == m
        )
        want[d] = (
            len(t),
            *[c for _, c in counts],
            dom,
            (m * 1000) // len(t) if len(t) > 0 else 0,
        )
    names = [n for n, _ in SCRIPT_CLASSES]
    got = {
        r["doc_id"]: (
            r["n_chars"],
            *[r[f"n_{n}"] for n in names],
            r["dominant"],
            r["dom_permille"],
        )
        for r in q_script_profile(spark, SF_SMOKE).collect()
    }
    assert got == want
    assert {v[-2] for v in got.values()} == {"latin"}
    assert all(v[-1] > 0 for v in got.values())
    for v in got.values():
        for c in v[1:-2]:
            assert c <= v[0]


def test_script_profile_classes_cross_engine_on_real_scripts(spark):
    """The \\x{...} class patterns evaluated by BOTH engines on
    constructed genuinely-multiscript strings (han, kana, hangul,
    cyrillic, arabic, accents, emoji) — counts must agree exactly,
    so a Java-vs-RE2 divergence on the range syntax cannot hide
    behind the ASCII-only synthetic corpus."""
    import duckdb

    from rxtls_spark.queries_training import SCRIPT_CLASSES

    samples = [
        "hello 你好世界 world",          # han
        "コンニチハ kana あ",    # kana
        "한국어 hangul mix 123",             # hangul
        "привет cyrillic", # cyrillic
        "مرحبا arabic",         # arabic
        "café naïve œuvre",               # latin ext
        "emoji \U0001f600 outside bmp",                  # astral
        "",
    ]
    sdf = spark.createDataFrame([(s,) for s in samples], "text string")
    import pyspark.sql.functions as F

    spark_rows = sdf.select(
        *[
            F.regexp_count(F.col("text"), F.lit(pat)).alias(name)
            for name, pat in SCRIPT_CLASSES
        ]
    ).collect()
    con = duckdb.connect()
    for i, s in enumerate(samples):
        for name, pat in SCRIPT_CLASSES:
            duck = con.execute(
                "SELECT len(regexp_extract_all(?, ?))", [s, pat]
            ).fetchone()[0]
            assert spark_rows[i][name] == duck, (s, name)
    # and the classes genuinely fire on their scripts
    assert spark_rows[0]["cjk"] == 4
    assert spark_rows[3]["cyrillic"] == 6
    assert spark_rows[4]["arabic"] == 5
    assert spark_rows[5]["latin"] > 8


def test_span_corrupt_matches_python_replica(spark):
    """Span-corruption rows recomputed in Python (same knuth span
    lengths/offsets per half, same single-array joins) —
    bit-identical.  T5 contract locks: spans never overlap and never
    cross the half boundary, reconstruction holds (input tokens +
    target tokens == original multiset + sentinels), sc=0 docs pass
    through with empty targets, and both sc values occur."""
    import hashlib
    import re

    from rxtls_spark.functions.hashing import KNUTH_A, KNUTH_P
    from rxtls_spark.queries_training import (
        SC_MAX_LEN,
        SC_MIN_TOKENS,
        SC_SENTINELS,
        q_span_corrupt,
    )
    from tests.conftest import SF_SMOKE

    ws = re.compile(r"[ \t\n\x0B\f\r]+")

    def kh(x):
        return ((x % KNUTH_P) * KNUTH_A) % KNUTH_P

    def md5(s):
        return hashlib.md5(s.encode("utf-8")).hexdigest()

    texts = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .select("doc_id", "text")
        .collect()
        if r["text"].strip() != ""
    }
    want = {}
    n_sc1 = n_sc0 = 0
    for d, txt in texts.items():
        t = ws.split(txt.strip().lower())
        n = len(t)
        half = n // 2
        segs = [(1, half), (half + 1, n)]
        ss, ls = [], []
        for k, (gs, ge) in enumerate(segs):
            seg_len = ge - gs + 1
            ln = min(1 + kh(d * 2 + k) % SC_MAX_LEN, seg_len)
            off = kh(d * 5 + k) % (seg_len - ln + 1)
            ss.append(gs + off)
            ls.append(ln)
        if n >= SC_MIN_TOKENS:
            n_sc1 += 1
            s0, l0, s1, l1 = ss[0], ls[0], ss[1], ls[1]
            e0, e1 = s0 + l0 - 1, s1 + l1 - 1
            assert e0 <= half < s1, d  # spans confined to halves
            inp = (
                t[: s0 - 1]
                + [SC_SENTINELS[0]]
                + t[e0 : s1 - 1]
                + [SC_SENTINELS[1]]
                + t[e1:]
            )
            tgt = (
                [SC_SENTINELS[0]]
                + t[s0 - 1 : e0]
                + [SC_SENTINELS[1]]
                + t[s1 - 1 : e1]
                + [SC_SENTINELS[2]]
            )
            # reconstruction: input+target == original + sentinels
            extra = [
                SC_SENTINELS[0], SC_SENTINELS[0],
                SC_SENTINELS[1], SC_SENTINELS[1], SC_SENTINELS[2],
            ]
            assert sorted(inp + tgt) == sorted(t + extra), d
            want[d] = (
                1,
                n,
                l0 + l1,
                md5(" ".join(inp)),
                md5(" ".join(tgt)),
            )
        else:
            n_sc0 += 1
            want[d] = (0, n, 0, md5(" ".join(t)), md5(""))
    got = {
        r["doc_id"]: (
            r["sc"],
            r["n"],
            r["n_masked"],
            r["input_md5"],
            r["target_md5"],
        )
        for r in q_span_corrupt(spark, SF_SMOKE).collect()
    }
    assert got == want
    assert n_sc1 > 0


def test_mlm_transform_matches_python_replica(spark):
    """MLM rows recomputed in Python (same knuth per-position draws,
    in-doc random replacement, 80/10/10 cuts) — bit-identical.
    Contract locks: n_mask_tok + n_rand <= n_masked <= n, the mask
    rate lands near 15% corpus-wide, and all three masked classes
    occur somewhere."""
    import hashlib
    import re

    from rxtls_spark.functions.hashing import KNUTH_A, KNUTH_P
    from rxtls_spark.queries_training import (
        MLM_KEEP_TO,
        MLM_MASK,
        MLM_MASK_TO,
        MLM_POS_SALT,
        MLM_RAND_SALT,
        MLM_RAND_TO,
        q_mlm_transform,
    )
    from tests.conftest import SF_SMOKE

    ws = re.compile(r"[ \t\n\x0B\f\r]+")

    def kh(x):
        return ((x % KNUTH_P) * KNUTH_A) % KNUTH_P

    def md5(s):
        return hashlib.md5(s.encode("utf-8")).hexdigest()

    texts = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .select("doc_id", "text")
        .collect()
        if r["text"].strip() != ""
    }
    want = {}
    tot_n = tot_masked = tot_mask_tok = tot_rand = 0
    for d, txt in texts.items():
        t = ws.split(txt.strip().lower())
        n = len(t)
        masked, labels = [], []
        n_masked = n_mask_tok = n_rand = 0
        for i in range(1, n + 1):
            r = kh(d * MLM_POS_SALT + i) % 1000
            if r < MLM_MASK_TO:
                masked.append(MLM_MASK)
                n_mask_tok += 1
            elif r < MLM_RAND_TO:
                masked.append(t[kh(d * MLM_RAND_SALT + i) % n])
                n_rand += 1
            else:
                masked.append(t[i - 1])
            if r < MLM_KEEP_TO:
                labels.append(t[i - 1])
                n_masked += 1
        want[d] = (
            n,
            n_masked,
            n_mask_tok,
            n_rand,
            md5(" ".join(masked)),
            md5(" ".join(labels)),
        )
        tot_n += n
        tot_masked += n_masked
        tot_mask_tok += n_mask_tok
        tot_rand += n_rand
    got = {
        r["doc_id"]: (
            r["n"],
            r["n_masked"],
            r["n_mask_tok"],
            r["n_rand"],
            r["input_md5"],
            r["labels_md5"],
        )
        for r in q_mlm_transform(spark, SF_SMOKE).collect()
    }
    assert got == want
    for v in got.values():
        assert v[2] + v[3] <= v[1] <= v[0]
    assert 0.10 <= tot_masked / tot_n <= 0.20
    assert tot_mask_tok > 0 and tot_rand > 0
    assert tot_masked - tot_mask_tok - tot_rand > 0  # keep class fires


def test_nsp_pairs_matches_python_replica(spark):
    """Every eligible doc (≥2 tokens) must emit exactly one pair
    equal to the Python replica (knuth partner jump, NotNext draw,
    half slices, [SEP]-packed md5); IsNext pairs must reconstruct the
    doc's own token stream, NotNext pairs must carry the partner's
    continuation, missing partners must force IsNext, and both
    classes must be well-populated (the draw is ~NSP_RATE permille)."""
    import hashlib
    import re

    from rxtls_spark.functions.hashing import KNUTH_A, KNUTH_P
    from rxtls_spark.queries_training import (
        NSP_JUMP_MOD,
        NSP_RATE,
        NSP_SALT,
        NSP_SEP,
        q_nsp_pairs,
    )
    from tests.conftest import SF_SMOKE

    docs = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .select("doc_id", "text")
        .collect()
        if r["text"].strip()
    }
    halves = {}
    for d, text in docs.items():
        t = re.split("[ \t\n\x0b\f\r]+", text.strip().lower())
        if len(t) >= 2:
            halves[d] = (t[: len(t) // 2], t[len(t) // 2 :])

    def kh(x: int) -> int:
        return ((x % KNUTH_P) * KNUTH_A) % KNUTH_P

    want = {}
    n_notnext = 0
    for d, (sa, sb) in halves.items():
        partner = d + 1 + kh(d * 3) % NSP_JUMP_MOD
        draw = kh(d * NSP_SALT) % 1000
        if partner in halves and draw < NSP_RATE:
            is_next, chosen = 0, halves[partner][1]
            n_notnext += 1
        else:
            is_next, chosen = 1, sb
        stream = " ".join(sa + [NSP_SEP] + chosen)
        want[d] = (
            partner,
            is_next,
            len(sa),
            len(chosen),
            hashlib.md5(stream.encode()).hexdigest(),
        )

    got = {
        r["doc_id"]: (
            r["partner_id"],
            r["is_next"],
            r["n_a"],
            r["n_b"],
            r["pair_md5"],
        )
        for r in q_nsp_pairs(spark, SF_SMOKE).collect()
    }
    assert got == want
    assert len(got) == len(halves)  # exactly one pair per eligible doc
    n_is_next = sum(1 for v in got.values() if v[1] == 1)
    assert n_notnext > 0 and n_is_next > 0
    # the NotNext rate can only fall below ~NSP_RATE permille via
    # missing partners — never exceed it
    assert n_notnext <= NSP_RATE / 1000 * len(halves) * 1.2


def test_preference_pairs_matches_replica_and_pairing_contracts(spark):
    """Every pair must equal the Python replica (PREF_K knuth sample,
    (q_e5, doc_id) rank, mirror pairing); within each source the pair
    count must be n DIV 2, chosen/rejected sets must be disjoint,
    margins must be non-negative and non-increasing in pair_rank
    (widest gap first), and the e5 quality numerators must match the
    shared quality_score."""
    import math
    import re

    from rxtls_spark.functions.hashing import KNUTH_A, KNUTH_P
    from rxtls_spark.queries_training import PREF_K, q_preference_pairs
    from tests.conftest import SF_SMOKE

    rows = (
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .select("doc_id", "source", "text")
        .collect()
    )

    def quality(text: str) -> int:
        n = max(len(text), 1)
        alpha = sum(1 for c in text if c.isascii() and c.isalpha()) / n
        digit = sum(1 for c in text if c.isascii() and c.isdigit()) / n
        punct = sum(1 for c in text if c in ".,;:!?") / n
        q = max(
            0.0,
            min(
                1.0,
                0.4 * alpha
                + 0.3 * min(len(text) / 500.0, 1.0)
                + 0.3 * (1.0 - min(1.0, 4.0 * punct + 4.0 * digit)),
            ),
        )
        return math.floor(q * 100000 + 0.5)

    per_source: dict[str, list] = {}
    for r in rows:
        h = ((r["doc_id"] % KNUTH_P) * KNUTH_A) % KNUTH_P
        per_source.setdefault(r["source"], []).append(
            (h, r["doc_id"], quality(r["text"]))
        )
    want = {}
    for s, rs in per_source.items():
        keep = sorted(rs)[:PREF_K]
        ranked = sorted((q, d) for _, d, q in keep)
        n = len(ranked)
        for i in range(1, n // 2 + 1):
            rej_q, rej_d = ranked[i - 1]
            cho_q, cho_d = ranked[n - i]
            want[(s, i)] = (cho_d, rej_d, cho_q, rej_q, cho_q - rej_q)

    got = {
        (r["source"], r["pair_rank"]): (
            r["chosen_id"],
            r["rejected_id"],
            r["chosen_q_e5"],
            r["rejected_q_e5"],
            r["margin_e5"],
        )
        for r in q_preference_pairs(spark, SF_SMOKE).collect()
    }
    assert got == want and got
    per_src: dict[str, list] = {}
    for (s, pr), v in got.items():
        per_src.setdefault(s, []).append((pr, v))
    for s, pairs in per_src.items():
        pairs.sort()
        chosen = {v[0] for _, v in pairs}
        rejected = {v[1] for _, v in pairs}
        assert not (chosen & rejected), s
        margins = [v[4] for _, v in pairs]
        assert all(m >= 0 for m in margins)
        assert margins == sorted(margins, reverse=True), s
        n = len(per_source[s][:PREF_K])
        assert len(pairs) == min(len(per_source[s]), PREF_K) // 2


def test_random_projection_matches_replica_and_jl_bound(spark):
    """Every pair row must equal the exact-int Python replica (e4
    floors, the same spliced ±1 signs, vec_id+1 pairing), and the JL
    contract must hold: the MEAN distortion ratio over all pairs
    concentrates near 1e5 (E[pd2] = RP_DIM·od2 for ±1 entries — s.e.
    of the mean ≈ sqrt(2/RP_DIM)/sqrt(n_pairs) ≈ 2%), while individual
    pairs are allowed the full JL spread."""
    import math

    from rxtls_spark.queries_training import (
        RP_DIM,
        _rp_signs,
        q_random_projection,
    )
    from tests.conftest import SF_SMOKE

    signs = _rp_signs()
    vecs = {
        r["vec_id"]: [
            math.floor(float(x) * 10000 + 0.5) for x in r["embedding"]
        ]
        for r in spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
        .select("vec_id", "embedding")
        .collect()
    }
    want = {}
    for vid, xa in vecs.items():
        if vid + 1 not in vecs:
            continue
        xb = vecs[vid + 1]
        od2 = sum((p - q) * (p - q) for p, q in zip(xa, xb))
        ya = [sum(s * x for s, x in zip(signs[j], xa)) for j in range(RP_DIM)]
        yb = [sum(s * x for s, x in zip(signs[j], xb)) for j in range(RP_DIM)]
        pd2 = sum((p - q) * (p - q) for p, q in zip(ya, yb))
        ratio = 0 if od2 == 0 else pd2 * 100000 // (RP_DIM * od2)
        want[vid] = (od2, pd2, ratio)

    got = {
        r["vec_id"]: (r["od2"], r["pd2"], r["ratio_e5"])
        for r in q_random_projection(spark, SF_SMOKE).collect()
    }
    assert got == want and got
    ratios = [v[2] for v in got.values()]
    mean = sum(ratios) / len(ratios)
    assert 85000 < mean < 115000, mean
    assert all(v[0] > 0 for v in got.values())  # no degenerate pairs


def test_grad_noise_scale_matches_replica(spark):
    """The single-row output must equal the bit-exact Python replica
    (shared GD weights, e2-floored (p, x) factors, knuth permille
    gate, the one-expression double ratio); the sample must be a
    strict non-empty subset, sum_sq must bound the per-component
    means (Cauchy-Schwarz n·Q ≥ |S|² ⇒ bsimple ≥ 0), and the noise
    scale must be positive (per-example gradients genuinely
    disagree)."""
    import math

    from rxtls_spark.functions.hashing import KNUTH_A, KNUTH_P
    from rxtls_spark.queries_training import (
        GNS_PERMILLE,
        GNS_SALT,
        _logreg_train,
        logreg_features,
        q_grad_noise_scale,
    )
    from tests.conftest import SF_SMOKE

    fx = logreg_features(
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    )
    rows = fx.collect()
    _, wv = _logreg_train(fx)
    n = s0 = s1 = s2 = s3 = q = 0
    for r in rows:
        if ((r["doc_id"] * GNS_SALT % KNUTH_P) * KNUTH_A) % KNUTH_P % 1000 >= GNS_PERMILLE:
            continue
        m = wv[0] * 1.0 + wv[1] * r["x1"] + wv[2] * r["x2"] + wv[3] * r["x3"]
        dp = math.floor(1.0 / (1.0 + math.exp(-m)) * 100 + 0.5) - 100 * int(r["y"])
        g = (
            dp * 100,
            dp * math.floor(r["x1"] * 100 + 0.5),
            dp * math.floor(r["x2"] * 100 + 0.5),
            dp * math.floor(r["x3"] * 100 + 0.5),
        )
        n += 1
        s0 += g[0]
        s1 += g[1]
        s2 += g[2]
        s3 += g[3]
        q += sum(x * x for x in g)
    assert 0 < n < len(rows)
    ss = s0 * s0 + s1 * s1 + s2 * s2 + s3 * s3
    b = math.floor((float(n) * float(q) - float(ss)) / float(ss) * 1000)

    [row] = q_grad_noise_scale(spark, SF_SMOKE).collect()
    assert (
        row["n"],
        row["s0"],
        row["s1"],
        row["s2"],
        row["s3"],
        row["sum_sq"],
    ) == (n, s0, s1, s2, s3, q)
    assert row["bsimple_e3"] == b
    assert n * q >= ss  # Cauchy-Schwarz
    assert row["bsimple_e3"] > 0


def test_hamming_codes_matches_replica_and_simhash_calibration(spark):
    """Codes and pair rows must equal the Python replica (sign bits,
    two 32-bit halves, XOR popcount Hamming, e5-floored cosine); the
    SimHash contract must hold in aggregate: mean cosine of low-
    Hamming pairs must exceed mean cosine of high-Hamming pairs (the
    monotone calibration the binary index depends on), and ham must
    stay in [0, 64]."""
    import math

    from rxtls_spark.queries_training import q_hamming_codes
    from tests.conftest import SF_SMOKE

    vecs = {
        r["vec_id"]: [float(x) for x in r["embedding"]]
        for r in spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
        .select("vec_id", "embedding")
        .collect()
    }

    def code(v, lo):
        return sum(
            1 << (i - lo) for i in range(lo, lo + 32) if v[i - 1] > 0
        )

    def cos_e5(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        c = dot / (na * nb) if na > 0 and nb > 0 else 0.0
        return math.floor(c * 100000)

    want = {}
    for vid, va in vecs.items():
        if vid + 1 not in vecs:
            continue
        vb = vecs[vid + 1]
        lo_a, hi_a = code(va, 1), code(va, 33)
        lo_b, hi_b = code(vb, 1), code(vb, 33)
        ham = bin(lo_a ^ lo_b).count("1") + bin(hi_a ^ hi_b).count("1")
        want[vid] = (lo_a, hi_a, ham, cos_e5(va, vb))

    got = {
        r["vec_id"]: (r["code_lo"], r["code_hi"], r["ham"], r["cos_e5"])
        for r in q_hamming_codes(spark, SF_SMOKE).collect()
    }
    # cosine is a float fold: engine sum order == replica sum order
    # (index order) so e5 floors agree exactly — proven by equality
    assert got == want and got
    hams = sorted(v[2] for v in got.values())
    med = hams[len(hams) // 2]
    lo_cos = [v[3] for v in got.values() if v[2] <= med]
    hi_cos = [v[3] for v in got.values() if v[2] > med]
    assert lo_cos and hi_cos
    assert sum(lo_cos) / len(lo_cos) > sum(hi_cos) / len(hi_cos)
    assert all(0 <= v[2] <= 64 for v in got.values())


def test_quantile_normalize_matches_replica_and_mapping_contracts(spark):
    """Every mapping row must equal the Python replica (exact bucket
    integers, e9 integer CDFs, min-crossing lookup against the pooled
    histogram); within a source norm_bucket must be monotone
    non-decreasing in bucket, each source's TOP bucket must map to
    the pooled top bucket (cdf_e9 == 1e9 on both sides), and the
    normalization must actually move something (some source bucket
    maps to a different pooled bucket)."""
    import math

    from rxtls_spark.queries_training import q_quantile_normalize
    from tests.conftest import SF_SMOKE

    rows = (
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .select("source", "text")
        .collect()
    )

    def bucket(text: str) -> int:
        n = max(len(text), 1)
        alpha = sum(1 for c in text if c.isascii() and c.isalpha()) / n
        digit = sum(1 for c in text if c.isascii() and c.isdigit()) / n
        punct = sum(1 for c in text if c in ".,;:!?") / n
        q = max(
            0.0,
            min(
                1.0,
                0.4 * alpha
                + 0.3 * min(len(text) / 500.0, 1.0)
                + 0.3 * (1.0 - min(1.0, 4.0 * punct + 4.0 * digit)),
            ),
        )
        # the quality_score pipeline floors to e5 FIRST (round5_stable)
        return math.floor(math.floor(q * 100000 + 0.5) * 1.0) // 100

    from collections import Counter

    per_sb: Counter = Counter()
    pooled: Counter = Counter()
    for r in rows:
        b = bucket(r["text"])
        per_sb[(r["source"], b)] += 1
        pooled[b] += 1
    n_total = sum(pooled.values())
    gb, gc = [], []
    cum = 0
    for b in sorted(pooled):
        cum += pooled[b]
        gb.append(b)
        gc.append(cum * 1_000_000_000 // n_total)
    src_tot: Counter = Counter()
    for (s, _), n in per_sb.items():
        src_tot[s] += n
    want = {}
    for s in src_tot:
        cum_s = 0
        for b in sorted(b2 for (s2, b2) in per_sb if s2 == s):
            n = per_sb[(s, b)]
            cum_s += n
            cdf = cum_s * 1_000_000_000 // src_tot[s]
            norm = next(g for g, c in zip(gb, gc) if c >= cdf)
            want[(s, b)] = (n, cdf, norm)

    got = {
        (r["source"], r["bucket"]): (
            r["n_docs"],
            r["cdf_e9"],
            r["norm_bucket"],
        )
        for r in q_quantile_normalize(spark, SF_SMOKE).collect()
    }
    assert got == want and got
    per_src: dict[str, list] = {}
    for (s, b), (_, _, nb) in got.items():
        per_src.setdefault(s, []).append((b, nb))
    moved = 0
    for s, pairs in per_src.items():
        pairs.sort()
        norms = [nb for _, nb in pairs]
        assert norms == sorted(norms), s  # monotone mapping
        top_b, top_nb = pairs[-1]
        assert top_nb == gb[-1], s  # CDF 1e9 maps to pooled top
        moved += sum(1 for b, nb in pairs if nb != b)
    assert moved > 0


def test_best_of_n_matches_replica_and_monotone(spark):
    """Every (source, n) row must equal the Python replica (knuth
    sample order, prefix conditional max of the e5 quality); the BoN
    curve must be monotone non-decreasing in n, n_eff must equal
    min(sample size, n), the n=1 row must be the first sampled doc's
    own quality, and the top grid point must equal the full-sample
    max."""
    import math

    from rxtls_spark.functions.hashing import KNUTH_A, KNUTH_P
    from rxtls_spark.queries_training import BON_GRID, BON_MAX, q_best_of_n
    from tests.conftest import SF_SMOKE

    rows = (
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .select("doc_id", "source", "text")
        .collect()
    )

    def quality(text: str) -> int:
        n = max(len(text), 1)
        alpha = sum(1 for c in text if c.isascii() and c.isalpha()) / n
        digit = sum(1 for c in text if c.isascii() and c.isdigit()) / n
        punct = sum(1 for c in text if c in ".,;:!?") / n
        q = max(
            0.0,
            min(
                1.0,
                0.4 * alpha
                + 0.3 * min(len(text) / 500.0, 1.0)
                + 0.3 * (1.0 - min(1.0, 4.0 * punct + 4.0 * digit)),
            ),
        )
        return math.floor(q * 100000 + 0.5)

    per_source: dict[str, list] = {}
    for r in rows:
        h = ((r["doc_id"] % KNUTH_P) * KNUTH_A) % KNUTH_P
        per_source.setdefault(r["source"], []).append(
            (h, r["doc_id"], quality(r["text"]))
        )
    want = {}
    for s, rs in per_source.items():
        keep = [q for _, _, q in sorted(rs)[:BON_MAX]]
        for n in BON_GRID:
            pre = keep[:n]
            want[(s, n)] = (len(pre), max(pre))

    got = {
        (r["source"], r["n"]): (r["n_eff"], r["bon_q_e5"])
        for r in q_best_of_n(spark, SF_SMOKE).collect()
    }
    assert got == want and got
    for s, rs in per_source.items():
        keep = [q for _, _, q in sorted(rs)[:BON_MAX]]
        curve = [got[(s, n)][1] for n in BON_GRID]
        assert curve == sorted(curve), s  # monotone in n
        assert got[(s, 1)][1] == keep[0]
        assert curve[-1] == max(keep)
        for n in BON_GRID:
            assert got[(s, n)][0] == min(len(keep), n)


def test_lsh_bucket_stats_matches_replica_and_accounting(spark):
    """Per-band rows must equal the Python replica (md5+knuth
    signatures, 4×4 banding, CSV bucket keys, exact pair counts);
    every band must account for every doc (n_docs == corpus), the
    candidate-pair identity Σ c(c−1)/2 must hold, singletons must
    generate no pairs, and near-duplicate docs (injected exact dups
    share all shingles) must collide in EVERY band."""
    import hashlib
    import re
    from collections import Counter

    from rxtls_spark.functions.hashing import KNUTH_A, KNUTH_P
    from rxtls_spark.queries_training import (
        CAL_PERMS,
        CAL_STEP,
        LSH_BANDS,
        LSH_ROWS,
        q_lsh_bucket_stats,
    )
    from tests.conftest import SF_SMOKE

    rows = (
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    )

    def sig_of(text: str) -> list[int]:
        t = re.split("[ \t\n\x0b\f\r]+", text.strip().lower())
        if len(t) >= 3:
            sh = [" ".join(t[i : i + 3]) for i in range(len(t) - 2)]
        else:
            sh = [" ".join(t)]
        keys = [
            int(hashlib.md5(g.encode()).hexdigest()[:13], 16) for g in sh
        ]
        return [
            min((((x + k * CAL_STEP) % KNUTH_P) * KNUTH_A) % KNUTH_P for x in keys)
            for k in range(CAL_PERMS)
        ]

    buckets: Counter = Counter()
    n_docs_total = 0
    sigs = {}
    for r in rows:
        if not r["text"].strip():
            continue
        n_docs_total += 1
        s = sig_of(r["text"])
        sigs[r["doc_id"]] = s
        for b in range(LSH_BANDS):
            key = ",".join(
                str(x) for x in s[b * LSH_ROWS : (b + 1) * LSH_ROWS]
            )
            buckets[(b, key)] += 1
    want = {}
    for b in range(LSH_BANDS):
        cs = [c for (bb, _), c in buckets.items() if bb == b]
        want[b] = (
            len(cs),
            sum(cs),
            max(cs),
            sum(1 for c in cs if c == 1),
            sum(c * (c - 1) // 2 for c in cs),
        )

    got = {
        r["band"]: (
            r["n_buckets"],
            r["n_docs"],
            r["max_bucket"],
            r["n_singletons"],
            r["cand_pairs"],
        )
        for r in q_lsh_bucket_stats(spark, SF_SMOKE).collect()
    }
    assert got == want and len(got) == LSH_BANDS
    for b, (nb, nd, mx, s1, cp) in got.items():
        assert nd == n_docs_total
        assert mx >= 2  # the corpus has exact dups: some bucket collides
        assert cp >= mx * (mx - 1) // 2
        assert s1 <= nb


def test_dp_noisy_counts_matches_replica_and_dp_contracts(spark):
    """Rows must equal the Python replica (identical inverse-CDF
    table, md5(salt‖group) knuth permille draws); groups must
    partition the corpus, noise must stay within the table's support,
    noisy_n must clamp at 0, and the noise must not be all-zero
    across groups (the mechanism actually perturbs)."""
    import hashlib

    from rxtls_spark.functions.hashing import KNUTH_A, KNUTH_P
    from rxtls_spark.queries_training import (
        DP_EPS_E3,
        DP_SALT,
        _dp_noise_table,
        q_dp_noisy_counts,
    )
    from tests.conftest import SF_SMOKE

    tab = _dp_noise_table()
    rows = (
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .select("source", "lang")
        .collect()
    )
    from collections import Counter

    true_n: Counter = Counter()
    for r in rows:
        true_n[(r["source"], r["lang"])] += 1
    want = {}
    for (s, lg), n in true_n.items():
        key = int(
            hashlib.md5(f"{DP_SALT}{s}|{lg}".encode()).hexdigest()[:13], 16
        )
        draw = ((key % KNUTH_P) * KNUTH_A) % KNUTH_P % 1000
        noise = tab[draw]
        want[(s, lg)] = (n, noise, max(n + noise, 0), DP_EPS_E3)

    got = {
        (r["source"], r["lang"]): (
            r["true_n"],
            r["noise"],
            r["noisy_n"],
            r["eps_e3"],
        )
        for r in q_dp_noisy_counts(spark, SF_SMOKE).collect()
    }
    assert got == want and got
    assert sum(v[0] for v in got.values()) == len(rows)
    mx = max(abs(x) for x in tab)
    assert all(abs(v[1]) <= mx for v in got.values())
    assert all(v[2] >= 0 for v in got.values())
    assert any(v[1] != 0 for v in got.values())
    # table sanity: zero-mass ≈ (1-α)/(1+α) of permilles, symmetric
    assert 440 <= tab.count(0) <= 490
    assert abs(sum(tab)) <= 10


def test_hll_distinct_matches_replica_and_hll_contracts(spark):
    """The single-row sketch must equal the Python HLL replica
    (md5-13-hex keys, 64 registers, leading-zero ranks, exact BIGINT
    harmonic numerator, the identical estimate expression); the
    small-range branch must NOT fire (vocab >> m), every register
    must be in use, and the estimate must land within the ~3σ HLL
    band (σ ≈ 1.04/√64 = 13%) of the exact count."""
    import hashlib
    import math

    from rxtls_spark.queries_training import (
        HLL_M,
        HLL_REM_BITS,
        q_hll_distinct,
    )
    from tests.conftest import SF_SMOKE
    import re

    texts = [
        r["text"]
        for r in spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .select("text")
        .collect()
        if r["text"].strip()
    ]
    regs: dict[int, int] = {}
    exact = set()
    for t in texts:
        w = re.split("[ \t\n\x0b\f\r]+", t.strip().lower())
        for g in (f"{a} {b}" for a, b in zip(w, w[1:])):
            exact.add(g)
            x = int(hashlib.md5(g.encode()).hexdigest()[:13], 16)
            b, rem = x % HLL_M, x // HLL_M
            rho = HLL_REM_BITS + 1
            for k in range(1, HLL_REM_BITS + 1):
                if rem >= 1 << (HLL_REM_BITS - k):
                    rho = k
                    break
            regs[b] = max(regs.get(b, 0), rho)
    n_used = len(regs)
    two47 = 1 << (HLL_REM_BITS + 1)
    s_num = sum(1 << (HLL_REM_BITS + 1 - m) for m in regs.values()) + (
        HLL_M - n_used
    ) * two47
    raw = (
        (0.7213 / (1.0 + 1.079 / HLL_M))
        * HLL_M
        * HLL_M
        * float(two47)
        / float(s_num)
    )
    assert not (HLL_M - n_used > 0 and raw <= 2.5 * HLL_M)  # no small-range
    est_e3 = math.floor(raw * 1000)
    err = (est_e3 - len(exact) * 1000) * 1000
    err = (
        abs(err) // (len(exact) * 1000) * (1 if err >= 0 else -1)
    )

    [row] = q_hll_distinct(spark, SF_SMOKE).collect()
    assert (
        row["m"],
        row["n_used"],
        row["s_num"],
        row["est_e3"],
        row["n_exact"],
        row["err_permille"],
    ) == (HLL_M, n_used, s_num, est_e3, len(exact), err)
    assert row["n_used"] == HLL_M  # vocab >> m: every register hit
    assert abs(row["err_permille"]) < 390  # ~3σ of 1.04/sqrt(64)

def test_poisson_bootstrap_matches_replica_and_ci_contracts(spark):
    """Every source row must equal the Python replica (spliced
    Poisson(1) inverse-CDF weight table, knuth permille draws over
    (doc_id·MUL + b), Σw·q DIV Σw replicate means, row_number order
    stats).  Contracts: the weight table sums to EXACTLY 1000 (mean
    resample weight 1 — unbiasedness), its support spans 0..6, the CI
    brackets are ordered (lo <= hi), the point mean falls inside the
    bracket on the smoke corpus (deterministic draws — no flake), and
    the replicate means genuinely vary (the bootstrap resamples)."""
    import math

    from rxtls_spark.functions.hashing import KNUTH_A, KNUTH_P
    from rxtls_spark.queries_training import (
        BOOT_B,
        BOOT_DRAW_MUL,
        BOOT_HI_RANK,
        BOOT_LO_RANK,
        _poisson_weight_table,
        q_poisson_bootstrap,
    )
    from tests.conftest import SF_SMOKE

    tab = _poisson_weight_table()
    assert sum(tab) == 1000
    assert min(tab) == 0 and max(tab) >= 5

    rows = (
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .select("doc_id", "source", "text")
        .collect()
    )

    def quality(text: str) -> int:
        n = max(len(text), 1)
        alpha = sum(1 for c in text if c.isascii() and c.isalpha()) / n
        digit = sum(1 for c in text if c.isascii() and c.isdigit()) / n
        punct = sum(1 for c in text if c in ".,;:!?") / n
        q = max(
            0.0,
            min(
                1.0,
                0.4 * alpha
                + 0.3 * min(len(text) / 500.0, 1.0)
                + 0.3 * (1.0 - min(1.0, 4.0 * punct + 4.0 * digit)),
            ),
        )
        return math.floor(q * 100000 + 0.5)

    per_source: dict[str, list] = {}
    for r in rows:
        per_source.setdefault(r["source"], []).append(
            (r["doc_id"], quality(r["text"]))
        )
    want = {}
    varied = 0
    for s, ds in per_source.items():
        means = []
        for b in range(1, BOOT_B + 1):
            sw = swq = 0
            for doc_id, q in ds:
                draw = (
                    ((doc_id * BOOT_DRAW_MUL + b) % KNUTH_P) * KNUTH_A
                ) % KNUTH_P % 1000
                w = tab[draw]
                sw += w
                swq += w * q
            means.append((swq // sw if sw > 0 else 0, b))
        means.sort()
        lo = means[BOOT_LO_RANK - 1][0]
        hi = means[BOOT_HI_RANK - 1][0]
        point = sum(q for _, q in ds) // len(ds)
        want[s] = (len(ds), point, lo, hi, BOOT_B)
        if len({m for m, _ in means}) > 1:
            varied += 1
        assert lo <= hi, s
        assert lo <= point <= hi, s

    got = {
        r["source"]: (
            r["n_docs"],
            r["mean_e5"],
            r["boot_lo_e5"],
            r["boot_hi_e5"],
            r["n_reps"],
        )
        for r in q_poisson_bootstrap(spark, SF_SMOKE).collect()
    }
    assert got == want and got
    assert varied == len(per_source)  # every source's means vary

def test_boilerplate_lines_matches_replica_and_df_semantics(spark):
    """Per-doc rows must equal the Python replica (header injection,
    8-token windows, DF >= BP_DF_MIN drop, ordered rebuild md5).
    Semantics locks: every doc loses AT LEAST its header line (the
    injected boilerplate — DF = docs-per-source >> threshold), no
    organic window crosses the threshold on the smoke corpus (drops
    == header-prefix windows exactly), counts reconcile
    (n_bp + n_kept == n_lines), and the rebuilt md5 of a fully-
    stripped doc is md5('') — the empty-rebuild coalesce."""
    import hashlib
    import re

    from rxtls_spark.queries_training import (
        BP_DF_MIN,
        BP_W,
        q_boilerplate_lines,
    )
    from tests.conftest import SF_SMOKE

    rows = (
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .select("doc_id", "source", "text")
        .collect()
    )
    lines_by_doc: dict[int, list] = {}
    df_count: dict[str, set] = {}
    for r in rows:
        full = (
            f"nav {r['source']} home about contact login search footer "
            + r["text"]
        )
        toks = re.split(r"[ \t\n\x0B\f\r]+", full.strip())
        nch = (len(toks) + BP_W - 1) // BP_W
        ls = [
            " ".join(toks[i * BP_W : i * BP_W + BP_W]) for i in range(nch)
        ]
        lines_by_doc[r["doc_id"]] = ls
        for l in ls:
            df_count.setdefault(l, set()).add(r["doc_id"])
    bp = {l for l, docs in df_count.items() if len(docs) >= BP_DF_MIN}

    got = {r["doc_id"]: r for r in q_boilerplate_lines(spark, SF_SMOKE).collect()}
    assert set(got) == set(lines_by_doc)
    stripped_all = 0
    for doc_id, ls in lines_by_doc.items():
        keep = [l for l in ls if l not in bp]
        g = got[doc_id]
        assert g["n_lines"] == len(ls), doc_id
        assert g["n_kept"] == len(keep), doc_id
        assert g["n_bp"] == len(ls) - len(keep), doc_id
        assert g["n_bp"] + g["n_kept"] == g["n_lines"]
        assert g["n_bp"] >= 1, doc_id  # header always dropped
        assert g["n_kept_tokens"] == sum(len(l.split(" ")) for l in keep)
        want_md5 = hashlib.md5(" ".join(keep).encode()).hexdigest()
        assert g["kept_md5"] == want_md5, doc_id
        if not keep:
            assert g["kept_md5"] == hashlib.md5(b"").hexdigest()
            stripped_all += 1
    # only injected header windows are boilerplate on the smoke corpus
    for l in bp:
        assert l.startswith("nav src") or " footer" in l or l == "footer", l


def test_secret_scan_matches_replica_and_scrub_contracts(spark):
    """Every row must equal the Python replica (identical md5-derived
    injection, first-match aws → hex → b64 classification, typed-
    placeholder scrub).  Contracts: every injected doc blocks with
    exactly one find per class, clean docs carry zero counts and an
    unchanged (whitespace-normalized) text hash, and re-scanning the
    SCRUBBED text finds nothing (the redaction is complete — the
    pii_scrub idempotency contract)."""
    import hashlib
    import re

    from rxtls_spark.queries_training import (
        _P_AWS,
        _P_B64,
        _P_HEX,
        SECRET_MOD,
        SECRET_REM,
        q_secret_scan,
    )
    from tests.conftest import SF_SMOKE

    r_aws, r_hex, r_b64 = (
        re.compile(_P_AWS),
        re.compile(_P_HEX),
        re.compile(_P_B64),
    )

    def classify(tok):
        if r_aws.match(tok):
            return "aws"
        if r_hex.match(tok):
            return "hex"
        if r_b64.match(tok):
            if (
                re.search("[0-9]", tok)
                and re.search("[a-z]", tok)
                and re.search("[A-Z]", tok)
            ):
                return "conf"
            return "cand"
        return None

    def scan(doc_id, text):
        if doc_id % SECRET_MOD == SECRET_REM:
            h1 = hashlib.md5(str(doc_id).encode()).hexdigest()
            h2 = hashlib.md5(str(doc_id + 1).encode()).hexdigest()
            text = (
                f"{text} AKIA{h1[:16].upper()} {h1}{h2} "
                f"{h1[:10]}{h2[:10].upper()}9zZ+/"
            )
        toks = re.split("[ \t\n\x0B\f\r]+", text.strip())
        n = {"aws": 0, "hex": 0, "cand": 0, "conf": 0}
        out = []
        for t in toks:
            k = classify(t)
            if k == "aws":
                n["aws"] += 1
                out.append("<AWSKEY>")
            elif k == "hex":
                n["hex"] += 1
                out.append("<HEX>")
            elif k == "conf":
                n["cand"] += 1
                n["conf"] += 1
                out.append("<B64>")
            elif k == "cand":
                n["cand"] += 1
                out.append(t)
            else:
                out.append(t)
        verdict = (
            "block"
            if n["aws"] + n["hex"] + n["conf"] > 0
            else ("review" if n["cand"] > 0 else "clean")
        )
        scrubbed = " ".join(out)
        return (
            n["aws"],
            n["hex"],
            n["cand"],
            n["conf"],
            verdict,
            hashlib.md5(scrubbed.encode()).hexdigest(),
            scrubbed,
        )

    rows = (
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    )
    want, scrubbed_texts = {}, {}
    for r in rows:
        if r["text"].strip() == "":
            continue
        *w, scrubbed = scan(r["doc_id"], r["text"])
        want[r["doc_id"]] = tuple(w)
        scrubbed_texts[r["doc_id"]] = scrubbed

    got = {
        r["doc_id"]: (
            r["n_aws"],
            r["n_hex"],
            r["n_b64_cand"],
            r["n_b64_conf"],
            r["verdict"],
            r["scrubbed_md5"],
        )
        for r in q_secret_scan(spark, SF_SMOKE).collect()
    }
    assert got == want and got

    injected = [d for d in got if d % SECRET_MOD == SECRET_REM]
    assert injected
    for d in injected:
        n_aws, n_hex, n_cand, n_conf, verdict, _ = got[d]
        assert (n_aws, n_hex, verdict) == (1, 1, "block")
        assert n_conf >= 1 and n_cand >= n_conf
    cleans = [d for d in got if got[d][4] == "clean"]
    assert cleans
    for d in cleans[:50]:
        assert got[d][:4] == (0, 0, 0, 0)
    # redaction completeness: scrubbed text re-scans to zero finds
    for d, s in list(scrubbed_texts.items())[:200]:
        for t in s.split(" "):
            assert classify(t) in (None, "cand")


def test_bleu_pairs_matches_replica_and_metric_contracts(spark):
    """Every (doc_id, variant) row must equal the Python replica
    (Counter-clipped n-gram precisions, math-identical score
    expression).  Contracts: the `same` variant is the exact anchor
    (p1 == p2 == 1, logbleu_e3 == 0), every score is ≤ 0 (log of a
    probability plus a non-positive brevity term), the zero-overlap
    sentinel appears only when a precision numerator is zero, and
    `append` never beats `same`."""
    import math
    import re
    from collections import Counter

    from rxtls_spark.queries_training import q_bleu_pairs
    from tests.conftest import SF_SMOKE

    def toks(s):
        return re.split("[ \t\n\x0B\f\r]+", s.strip())

    def replica(a, b):
        ta, tb = toks(a), toks(b)
        ba = [f"{ta[i]} {ta[i+1]}" for i in range(len(ta) - 1)]
        bb = [f"{tb[i]} {tb[i+1]}" for i in range(len(tb) - 1)]

        def clip(cand, ref):
            cc, rc = Counter(cand), Counter(ref)
            return sum(min(n, rc[w]) for w, n in cc.items())

        p1n, p1d = clip(tb, ta), len(tb)
        p2n, p2d = clip(bb, ba), len(bb)
        r, c = len(ta), len(tb)
        if p1n == 0 or p2n == 0:
            s = -99000
        else:
            s = math.floor(
                (
                    0.5 * math.log(p1n / p1d)
                    + 0.5 * math.log(p2n / p2d)
                    + min(0.0, 1.0 - r / c)
                )
                * 1000
            )
        return (p1n, p1d, p2n, p2d, r, c, s)

    docs = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .where("doc_id % 20 = 0 AND trim(text) <> ''")
        .collect()
    }
    want = {}
    for d, a in docs.items():
        for variant, b in (
            ("same", a),
            ("append", a + " extra!"),
            ("sub", a.replace("a", "b")),
            ("half", a[: len(a) // 2]),
        ):
            want[(d, variant)] = replica(a, b)

    got = {
        (r["doc_id"], r["variant"]): (
            r["p1_num"],
            r["p1_den"],
            r["p2_num"],
            r["p2_den"],
            r["r_len"],
            r["c_len"],
            r["logbleu_e3"],
        )
        for r in q_bleu_pairs(spark, SF_SMOKE).collect()
    }
    assert got == want and got

    for d in docs:
        p1n, p1d, p2n, p2d, _r, _c, s = got[(d, "same")]
        assert (p1n, p2n, s) == (p1d, p2d, 0)
        assert got[(d, "append")][6] <= 0
    for v in got.values():
        assert v[6] <= 0
        if v[6] == -99000:
            assert v[0] == 0 or v[2] == 0


def test_bradley_terry_matches_duel_replica_and_mm_contracts(spark):
    """The duel matrix must equal an independent Python rebuild
    (knuth jump, cross-source distinct-quality duels, e5 quality);
    ranks must be the 1..n permutation ordered by (p DESC, source);
    Σp must equal n·1e6 up to the n truncations; and the integer MM
    fixed point must track an INDEPENDENT float MM replica (no
    clamps, real division) to within the truncation-noise budget."""
    from rxtls_spark.functions.hashing import KNUTH_A, KNUTH_P
    from rxtls_spark.queries_training import (
        BT_ITERS,
        BT_JUMP_MOD,
        BT_SALT,
        q_bradley_terry,
    )
    from rxtls_spark.queries_training import q_text_features
    from tests.conftest import SF_SMOKE

    feats = {
        r["doc_id"]: int(round(r["quality"] * 100000))
        for r in q_text_features(spark, SF_SMOKE).collect()
    }
    src = {
        r["doc_id"]: r["source"]
        for r in spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .select("doc_id", "source")
        .collect()
    }
    wmat: dict = {}
    for d, qa in feats.items():
        pj = d + 1 + ((d * BT_SALT % KNUTH_P) * KNUTH_A) % KNUTH_P % BT_JUMP_MOD
        if pj not in feats:
            continue
        qb = feats[pj]
        if src[d] == src[pj] or qa == qb:
            continue
        w, l = (src[d], src[pj]) if qa > qb else (src[pj], src[d])
        wmat[(w, l)] = wmat.get((w, l), 0) + 1
    srcs = sorted({a for a, _ in wmat} | {b for _, b in wmat})

    got = {r["source"]: r for r in q_bradley_terry(spark, SF_SMOKE).collect()}
    assert sorted(got) == srcs
    for s in srcs:
        assert got[s]["n_wins"] == sum(
            w for (a, _), w in wmat.items() if a == s
        )
        assert got[s]["n_games"] == got[s]["n_wins"] + sum(
            w for (_, b), w in wmat.items() if b == s
        )
    n = len(srcs)
    assert sorted(r["rank"] for r in got.values()) == list(range(1, n + 1))
    order = sorted(srcs, key=lambda s: (-got[s]["p_e6"], s))
    assert [got[s]["rank"] for s in order] == list(range(1, n + 1))
    tot = sum(r["p_e6"] for r in got.values())
    assert n * 10**6 - n <= tot <= n * 10**6

    # independent float MM (true division, no scaling/clamps)
    total = sum(wmat.values())
    m = {k: w / total for k, w in wmat.items()}
    wins = {s: sum(m.get((s, b), 0.0) for b in srcs) for s in srcs}
    games = {
        (a, b): m.get((a, b), 0.0) + m.get((b, a), 0.0)
        for a in srcs
        for b in srcs
        if a != b
    }
    p = {s: 1.0 for s in srcs}
    for _ in range(BT_ITERS):
        t = {
            s: sum(
                g / (p[s] + p[b])
                for (a, b), g in games.items()
                if a == s and g > 0
            )
            for s in srcs
        }
        pr = {s: (wins[s] / t[s] if t[s] > 0 else 0.0) for s in srcs}
        tp = sum(pr.values())
        p = {s: pr[s] * n / tp for s in srcs}
    for s in srcs:
        # e6-share floors on the inputs + 8 truncating rounds: allow
        # a generous but still rank-preserving budget
        assert abs(got[s]["p_e6"] - p[s] * 10**6) < 2 * 10**4, s


def test_isotonic_fit_matches_pava_and_monotone(spark):
    """The minimax form must equal exact-Fraction PAVA floored to e9
    on fuzzed histograms — floor commutes with max and min, so the
    max-min of e9-floored pooled rates IS the floored PAVA value; the
    query's histogram must equal a Python rebuild from the engine
    features and trained weights (the brier_decomp replica pattern);
    iso_e9 must be monotone non-decreasing and equal _iso_minimax of
    the returned rows."""
    import math
    import random
    from fractions import Fraction

    from rxtls_spark.queries_training import (
        ISO_BINS,
        ISO_W,
        _iso_minimax,
        _logreg_train,
        logreg_features,
        q_isotonic_fit,
    )
    from tests.conftest import SF_SMOKE

    def pava_floor_e9(rows):
        blocks: list = []
        for _b, n, pos in rows:
            blocks.append([n, pos, 1])
            while len(blocks) >= 2 and Fraction(
                blocks[-2][1], blocks[-2][0]
            ) >= Fraction(blocks[-1][1], blocks[-1][0]):
                n2, p2, c2 = blocks.pop()
                blocks[-1][0] += n2
                blocks[-1][1] += p2
                blocks[-1][2] += c2
        out: list = []
        for n, pos, c in blocks:
            out.extend([(pos * 10**9) // n] * c)
        return out

    rng = random.Random(7)
    for _ in range(80):
        nb = rng.randint(1, 12)
        rows = []
        for b in range(nb):
            n = rng.randint(1, 50)
            rows.append((b, n, rng.randint(0, n)))
        assert _iso_minimax(rows) == pava_floor_e9(rows), rows

    fx = logreg_features(
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    )
    feats = [(r["x1"], r["x2"], r["x3"], r["y"]) for r in fx.collect()]
    _, wv = _logreg_train(fx)
    hist: dict[int, list[int]] = {}
    for x1, x2, x3, y in feats:
        m = wv[0] * 1.0 + wv[1] * x1 + wv[2] * x2 + wv[3] * x3
        p = 1.0 / (1.0 + math.exp(-m))
        p_e3 = math.floor(p * 1000 + 0.5)
        b = min(p_e3 // ISO_W, ISO_BINS - 1)
        cur = hist.setdefault(b, [0, 0])
        cur[0] += 1
        cur[1] += int(y)
    rows = sorted((b, n, pos) for b, (n, pos) in hist.items())

    got = sorted(
        q_isotonic_fit(spark, SF_SMOKE).collect(), key=lambda r: r["bin"]
    )
    assert [(r["bin"], r["n"], r["n_pos"]) for r in got] == rows
    for r in got:
        assert r["rate_e9"] == (r["n_pos"] * 10**9) // r["n"]
    iso = [r["iso_e9"] for r in got]
    assert iso == _iso_minimax(rows) == pava_floor_e9(rows)
    assert all(a <= b for a, b in zip(iso, iso[1:]))
    assert sum(r["n"] for r in got) == len(feats)


def test_cooc_ppmi_matches_python_replica(spark):
    """Windowed skip-pair counts, endpoint marginals, total, e3-floored
    PMI/PPMI and the (c_ab DESC, a, b) ranks recomputed driver-side
    from the Spark-tokenized stream (tokenizer parity is the
    bigram_lm precedent): exact row equality.  Also locks the raw-
    stream pairing rule (pairs formed BEFORE the vocab filter), the
    unordered least/greatest convention, and that the smoke corpus
    exercises both PPMI branches (at least one positive pair)."""
    import math

    from pyspark.sql import functions as F

    from rxtls_spark.queries_training import (
        COOC_VOCAB_K,
        COOC_W,
        _docs,
        _lm_tokens,
        q_cooc_ppmi,
    )
    from tests.conftest import SF_SMOKE

    docs = (
        _docs(spark, SF_SMOKE)
        .select("doc_id", "text")
        .where(F.trim("text") != "")
    )
    tok_rows = docs.select(_lm_tokens().alias("t")).collect()

    uni = {}
    for r in tok_rows:
        for t in r["t"]:
            uni[t] = uni.get(t, 0) + 1
    vocab = {
        t
        for t, _c in sorted(uni.items(), key=lambda kv: (-kv[1], kv[0]))[
            :COOC_VOCAB_K
        ]
    }

    cab = {}
    for r in tok_rows:
        t = r["t"]
        for i in range(len(t)):
            for d in range(1, COOC_W + 1):
                if i + d >= len(t):
                    break
                x, y = t[i], t[i + d]
                if x in vocab and y in vocab:
                    key = (min(x, y), max(x, y))
                    cab[key] = cab.get(key, 0) + 1
    marg = {}
    for (a, b), c in cab.items():
        marg[a] = marg.get(a, 0) + c
        marg[b] = marg.get(b, 0) + c
    total = sum(cab.values())

    def pmi_e3(a, b, c):
        return math.floor(
            1000.0
            * math.log(
                (float(c) * float(total)) / (float(marg[a]) * float(marg[b]))
            )
        )

    order = sorted(cab.items(), key=lambda kv: (-kv[1], kv[0]))
    want = {
        (a, b): (
            rk + 1,
            c,
            marg[a],
            marg[b],
            pmi_e3(a, b, c),
            max(pmi_e3(a, b, c), 0),
        )
        for rk, ((a, b), c) in enumerate(order)
    }

    got = {
        (r["a"], r["b"]): (
            r["rank"],
            r["c_ab"],
            r["c_a"],
            r["c_b"],
            r["pmi_e3"],
            r["ppmi_e3"],
        )
        for r in q_cooc_ppmi(spark, SF_SMOKE).collect()
    }
    assert got == want
    assert any(v[5] > 0 for v in want.values()), (
        "smoke corpus must exercise the positive-PPMI branch"
    )
    assert any(v[4] < 0 for v in want.values()), (
        "smoke corpus must exercise the clamped branch"
    )


def test_platt_scaling_matches_python_replica(spark):
    """The Newton trajectory recomputed driver-side from the collected
    (p_e3, y) pairs with the identical 6-dp floor-stable means and the
    mirrored 2×2 solve, then the bin table and e3-floored midpoint
    sigmoid — exact row equality.  Also locks: the fitted map is
    monotone in the bin midpoint (A > 0) and orders the bins the same
    way as the raw rates (the calibration actually calibrates)."""
    import math

    from pyspark.sql import functions as F

    from rxtls_spark.queries_training import (
        ISO_BINS,
        ISO_W,
        PLATT_ITERS,
        _docs,
        _logreg_train,
        logreg_features,
        q_platt_scaling,
    )
    from tests.conftest import SF_SMOKE

    fx = logreg_features(_docs(spark, SF_SMOKE))
    _, wv = _logreg_train(fx)
    m = (
        F.lit(wv[0]) * F.lit(1.0)
        + F.lit(wv[1]) * F.col("x1")
        + F.lit(wv[2]) * F.col("x2")
        + F.lit(wv[3]) * F.col("x3")
    )
    p = F.lit(1.0) / (F.lit(1.0) + F.exp(-m))
    data = [
        (r["p_e3"] / 1000.0, float(r["y_l"]))
        for r in fx.select(
            F.floor(p * F.lit(1000.0) + F.lit(0.5))
            .cast("long")
            .alias("p_e3"),
            F.col("y").cast("long").alias("y_l"),
        ).collect()
    ]

    a = b = 0.0
    n = len(data)
    for _ in range(PLATT_ITERS):
        gx = g = hxx = hx = h = 0.0
        for x, y in data:
            s = 1.0 / (1.0 + math.exp(-(a * x + b)))
            w = s * (1.0 - s)
            gx += (s - y) * x
            g += s - y
            hxx += w * x * x
            hx += w * x
            h += w
        mgx, mg, mxx, mhx, mh = (
            math.floor(v / n * 1e6 + 0.5) / 1e6
            for v in (gx, g, hxx, hx, h)
        )
        det = mxx * mh - mhx * mhx
        a = a - (mh * mgx - mhx * mg) / det
        b = b - (mxx * mg - mhx * mgx) / det

    bins = {}
    for x, y in data:
        bn = min(int(round(x * 1000)) // ISO_W, ISO_BINS - 1)
        c, pos = bins.get(bn, (0, 0))
        bins[bn] = (c + 1, pos + int(y))
    want = {}
    for bn, (c, pos) in bins.items():
        mid = bn * ISO_W + ISO_W // 2
        sig = 1.0 / (1.0 + math.exp(-(a * (mid / 1000.0) + b)))
        want[bn] = (
            c,
            pos,
            (pos * 10**9) // c,
            mid,
            math.floor(sig * 1000.0 + 0.5),
        )

    got = {
        r["bin"]: (
            r["n"],
            r["n_pos"],
            r["rate_e9"],
            r["mid_e3"],
            r["platt_e3"],
        )
        for r in q_platt_scaling(spark, SF_SMOKE).collect()
    }
    assert got == want
    assert a > 0, "fit must be increasing on this data"
    rows = sorted(got.values(), key=lambda v: v[3])
    platt = [v[4] for v in rows]
    rates = [v[2] for v in rows]
    assert platt == sorted(platt), "sigmoid map must be monotone"
    assert rates == sorted(rates) and len(rows) >= 3, (
        "smoke data must give ≥3 bins with rates the map can track"
    )


def test_source_w1_drift_matches_python_replica(spark):
    """Per-pair Wasserstein-1 recomputed in Python from the Spark
    quality scores: exact BIGINT equality on Σ |Δcdf|·gap over the
    sorted observed buckets.  Also locks: all ordered pairs present,
    w1 ≥ 0, and the triangle sanity w1(a,b) ≤ w1(a,c) + w1(c,b) on
    the first triple (a pseudometric must satisfy it)."""
    import math
    from collections import defaultdict
    from itertools import combinations

    from pyspark.sql import functions as F

    from rxtls_spark.functions.text import quality_score
    from rxtls_spark.queries_training import _docs, q_source_w1_drift
    from tests.conftest import SF_SMOKE

    scored = (
        _docs(spark, SF_SMOKE)
        .select("source", quality_score().alias("quality"))
        .collect()
    )
    hist = defaultdict(lambda: defaultdict(int))
    for r in scored:
        qb = math.floor(r["quality"] * 100000 + 0.5) // 100
        hist[r["source"]][qb] += 1
    buckets = sorted({qb for h in hist.values() for qb in h})
    cdf = {}
    n = {}
    for src, h in hist.items():
        n[src] = sum(h.values())
        cum = 0
        cdf[src] = {}
        for qb in buckets:
            cum += h.get(qb, 0)
            cdf[src][qb] = (cum * 1_000_000_000) // n[src]

    def w1(a, b):
        return sum(
            abs(cdf[a][qb] - cdf[b][qb]) * (nqb - qb)
            for qb, nqb in zip(buckets, buckets[1:])
        )

    got = {
        (r["source_a"], r["source_b"]): r
        for r in q_source_w1_drift(spark, SF_SMOKE).collect()
    }
    assert set(got) == set(combinations(sorted(hist), 2))
    for (a, b), r in got.items():
        assert (r["n_a"], r["n_b"], r["w1_e9b"]) == (n[a], n[b], w1(a, b))
        assert r["w1_e9b"] >= 0
    srcs = sorted(hist)[:3]
    if len(srcs) == 3:
        a, b, c = srcs
        assert w1(a, b) <= w1(a, c) + w1(c, b) + 1  # integer-floor slack


def test_source_diversity_matches_python_replica(spark):
    """Simpson/effective-vocab/entropy recomputed in Python from the
    Spark-tokenized stream through the identical md5 bucket hash and
    integer forms: exact row equality.  Also locks the Hill-number
    identities 1 ≤ eff ≤ n_buckets·1e6 (inverse Simpson is bounded by
    the occupied-bucket count) and ent_e3 ≤ ⌊ln(64)·1e3⌋."""
    import hashlib
    import math
    from collections import defaultdict

    from pyspark.sql import functions as F

    from rxtls_spark.queries_training import (
        _docs,
        _lm_tokens,
        q_source_diversity,
    )
    from tests.conftest import SF_SMOKE

    rows = (
        _docs(spark, SF_SMOKE)
        .where(F.trim("text") != "")
        .select("source", _lm_tokens().alias("t"))
        .collect()
    )
    cnt = defaultdict(lambda: defaultdict(int))
    for r in rows:
        for tk in r["t"]:
            h = hashlib.md5(tk.encode()).hexdigest()
            b = (int(h[0], 16) * 16 + int(h[1], 16)) % 64
            cnt[r["source"]][b] += 1

    want = {}
    for src, bc in cnt.items():
        n_s = sum(bc.values())
        simpson = sum(((c * 10**6) // n_s) ** 2 for c in bc.values())
        ent = -sum(
            c * math.floor(math.log(c / n_s) * 1000.0) for c in bc.values()
        )
        want[src] = (
            n_s,
            len(bc),
            simpson,
            10**18 // simpson,
            ent,
            ent // n_s,
        )

    got = {
        r["source"]: (
            r["n_tokens"],
            r["n_buckets"],
            r["simpson_e12"],
            r["eff_e6"],
            r["ent_ne3"],
            r["ent_e3"],
        )
        for r in q_source_diversity(spark, SF_SMOKE).collect()
    }
    assert got == want
    for src, (n_s, nb, simp, eff, ent, ee3) in got.items():
        assert 10**6 <= eff <= nb * 10**6 + 10**6, src  # floor slack
        assert 0 <= ee3 <= math.floor(math.log(64) * 1000), src


def test_confident_learning_matches_python_replica(spark):
    """Thresholds, qualify/argmax rule and the confident joint
    recomputed in Python from the collected (p_e3, label) pairs:
    exact equality.  Also locks: thresholds are the truncating-DIV
    label-slice means, excluded docs are exactly the
    neither-threshold ones, and the smoke corpus populates all four
    joint cells (off-diagonal mass is the point of the audit)."""
    from pyspark.sql import functions as F

    from rxtls_spark.queries_training import (
        _docs,
        _logreg_train,
        logreg_features,
        q_confident_learning,
    )
    from tests.conftest import SF_SMOKE

    fx = logreg_features(_docs(spark, SF_SMOKE))
    _, wv = _logreg_train(fx)
    m = (
        F.lit(wv[0]) * F.lit(1.0)
        + F.lit(wv[1]) * F.col("x1")
        + F.lit(wv[2]) * F.col("x2")
        + F.lit(wv[3]) * F.col("x3")
    )
    p = F.lit(1.0) / (F.lit(1.0) + F.exp(-m))
    data = [
        (r["p_e3"], r["label"])
        for r in fx.select(
            F.floor(p * F.lit(1000.0) + F.lit(0.5))
            .cast("long")
            .alias("p_e3"),
            F.col("y").cast("long").alias("label"),
        ).collect()
    ]
    t1 = sum(pe for pe, y in data if y == 1) // sum(
        1 for _, y in data if y == 1
    )
    t0 = sum(1000 - pe for pe, y in data if y == 0) // sum(
        1 for _, y in data if y == 0
    )
    joint = {}
    excluded = 0
    for pe, y in data:
        q1, q0 = pe >= t1, 1000 - pe >= t0
        if q1 and q0:
            pred = 1 if pe >= 500 else 0
        elif q1:
            pred = 1
        elif q0:
            pred = 0
        else:
            excluded += 1
            continue
        joint[(y, pred)] = joint.get((y, pred), 0) + 1

    got = {
        (r["label"], r["pred"]): (r["n_docs"], r["t1_e3"], r["t0_e3"])
        for r in q_confident_learning(spark, SF_SMOKE).collect()
    }
    assert got == {k: (n, t1, t0) for k, n in joint.items()}
    assert len(got) == 4, "all four joint cells must populate"
    assert sum(n for n, _, _ in got.values()) + excluded == len(data)
    assert excluded >= 0


def test_textrank_matches_python_replica(spark):
    """TextRank ranks recomputed driver-side from the Spark cooc
    counts (the cab chain is locked by test_cooc_ppmi): rebuild
    edges/shares/iterations independently and require exact row
    equality.  Also locks: ranks stay positive, the damped fixpoint
    bound r ≤ 0.15e9 + 0.85·(mass in), and that a low-centrality
    token ranks last (the injected-dup token co-occurs mostly with
    itself, so its centrality must trail the main vocabulary)."""
    from collections import defaultdict

    from pyspark.sql import functions as F

    from rxtls_spark.queries_training import (
        TEXTRANK_ITERS,
        _cooc_cab,
        q_textrank_keywords,
    )
    from tests.conftest import SF_SMOKE

    cab = {
        (r["a"], r["b"]): r["c_ab"]
        for r in _cooc_cab(spark, SF_SMOKE).collect()
    }
    w = defaultdict(int)
    outs = defaultdict(list)
    edges = []
    for (a, b), c in cab.items():
        if a == b:
            continue
        edges += [(a, b, c), (b, a, c)]
    for j, i, c in edges:
        w[j] += c
    for j, i, c in edges:
        outs[j].append((i, (c * 10**6) // w[j]))
    nodes = sorted(w)
    rank = {t: 10**9 for t in nodes}
    for _ in range(TEXTRANK_ITERS):
        inc = dict.fromkeys(nodes, 0)
        for j, lst in outs.items():
            for i, s in lst:
                inc[i] += rank[j] * s
        rank = {
            t: 150000000 + (85 * (inc[t] // 10**6)) // 100 for t in nodes
        }
    order = sorted(nodes, key=lambda t: (-rank[t], t))
    want = [(k + 1, t, w[t], rank[t]) for k, t in enumerate(order)]

    got = [
        (r["rank"], r["token"], r["w_strength"], r["r_e9"])
        for r in q_textrank_keywords(spark, SF_SMOKE)
        .orderBy("rank")
        .collect()
    ]
    assert got == want
    assert all(r > 0 for _, _, _, r in got)
    assert got[-1][1] == "dup", "injected-dup token must rank last"


def test_best_snippet_matches_python_replica(spark):
    """Window density argmax recomputed in Python from the
    Spark-tokenized stream through the identical mid-frequency
    significance band: exact row equality including the snippet md5.
    Also locks: the scoring plan is a pure map (0 exchanges, no join,
    no window function), first-max tie-breaking, the short-doc
    clamped-window rule, and that the smoke corpus spreads best_nsig
    over ≥4 distinct values (the band is discriminative)."""
    import hashlib
    from collections import Counter, defaultdict

    from pyspark.sql import functions as F

    from rxtls_spark.functions.text import STOPWORDS
    from rxtls_spark.plans.checks import count_exchanges
    from rxtls_spark.queries_training import (
        COOC_VOCAB_K,
        SNIP_RANK_CUT,
        SNIP_W,
        _docs,
        _lm_tokens,
        q_best_snippet,
    )
    from tests.conftest import SF_SMOKE

    rows = (
        _docs(spark, SF_SMOKE)
        .where(F.trim("text") != "")
        .select("doc_id", _lm_tokens().alias("t"))
        .collect()
    )
    cnt = defaultdict(int)
    for r in rows:
        for tk in r["t"]:
            cnt[tk] += 1
    ranked = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[
        :COOC_VOCAB_K
    ]
    sig = {
        t
        for k, (t, _c) in enumerate(ranked)
        if k >= SNIP_RANK_CUT and t not in STOPWORDS
    }

    want = {}
    for r in rows:
        t = r["t"]
        n = len(t)
        npos = max(n - SNIP_W + 1, 1)
        s = [1 if x in sig else 0 for x in t]
        nsigs = [sum(s[i : i + SNIP_W]) for i in range(npos)]
        best = max(nsigs)
        pos = nsigs.index(best) + 1
        snip = " ".join(t[pos - 1 : pos - 1 + SNIP_W])
        want[r["doc_id"]] = (
            n,
            npos,
            pos,
            best,
            (best * best * 1000) // min(SNIP_W, n),
            hashlib.md5(snip.encode()).hexdigest(),
        )

    df = q_best_snippet(spark, SF_SMOKE)
    assert count_exchanges(df) == 0
    got = {
        r["doc_id"]: (
            r["n_tokens"],
            r["n_windows"],
            r["best_pos"],
            r["best_nsig"],
            r["score_e3"],
            r["snippet_md5"],
        )
        for r in df.collect()
    }
    assert got == want
    assert len(Counter(v[3] for v in want.values())) >= 4


def test_collocations_g2_matches_python_replica(spark):
    """Dunning G² recomputed in exact Python (ints + math.log floors)
    from the Spark-tokenized bigram stream: exact row equality on the
    top-k including the signed e3-floored score.  Also locks: the
    min-count gate excludes hapaxes from the RANKING but not from the
    marginals/N, terms with an empty cell contribute exactly 0, the
    (g2_e3 DESC, w1, w2) tie-break, and that the smoke corpus spreads
    g2_e3 over ≥10 distinct values (the statistic is discriminative)."""
    import math
    from collections import defaultdict

    from pyspark.sql import functions as F

    from rxtls_spark.queries_training import (
        G2_MIN_COUNT,
        G2_TOPK,
        _docs,
        _lm_tokens,
        q_collocations_g2,
    )
    from tests.conftest import SF_SMOKE

    rows = (
        _docs(spark, SF_SMOKE)
        .where(F.trim("text") != "")
        .select(_lm_tokens().alias("t"))
        .collect()
    )
    k11 = defaultdict(int)
    for r in rows:
        t = r["t"]
        for i in range(len(t) - 1):
            k11[(t[i], t[i + 1])] += 1
    row1 = defaultdict(int)
    col1 = defaultdict(int)
    for (w1, w2), k in k11.items():
        row1[w1] += k
        col1[w2] += k
    n_tot = sum(k11.values())

    def term(k, a, b):
        if k <= 0:
            return 0
        return math.floor(
            float(k) * math.log((float(k) * n_tot) / (float(a) * b)) * 1000.0
        )

    scored = []
    for (w1, w2), k in k11.items():
        if k < G2_MIN_COUNT:
            continue
        a, b = row1[w1], col1[w2]
        g2 = 2 * (
            term(k, a, b)
            + term(a - k, a, n_tot - b)
            + term(b - k, n_tot - a, b)
            + term(n_tot - a - b + k, n_tot - a, n_tot - b)
        )
        scored.append((w1, w2, k, a, b, g2))
    scored.sort(key=lambda x: (-x[5], x[0], x[1]))
    want = scored[:G2_TOPK]

    got = [
        (r["w1"], r["w2"], r["k11"], r["w1_count"], r["w2_count"], r["g2_e3"])
        for r in q_collocations_g2(spark, SF_SMOKE).collect()
    ]
    assert got == want
    assert len({x[5] for x in want}) >= 10
    assert all(x[2] >= G2_MIN_COUNT for x in got)


def test_chi2_select_matches_python_replica(spark):
    """Chi-square selection recomputed in exact Python (ints + IEEE
    doubles in the identical op order) from the Spark-tokenized
    distinct-token stream and the Spark lang_guess label: exact row
    equality including chi2_e3.  Also locks: contingency identities
    (a+b == df, rows sum to doc counts), the df ≥ CHI2_MIN_DF gate,
    the (chi2_e3 DESC, tok) tie-break, and that the statistic is
    discriminative on the smoke corpus (≥5 distinct chi2 values,
    top value > 0)."""
    from collections import defaultdict
    from math import floor

    from pyspark.sql import functions as F

    from rxtls_spark.functions.text import lang_guess
    from rxtls_spark.queries_training import (
        CHI2_MIN_DF,
        CHI2_TOPK,
        _docs,
        _lm_tokens,
        q_chi2_select,
    )
    from tests.conftest import SF_SMOKE

    rows = (
        _docs(spark, SF_SMOKE)
        .where(F.trim("text") != "")
        .select(
            _lm_tokens().alias("t"),
            F.when(lang_guess() == "en", F.lit(1))
            .otherwise(F.lit(0))
            .cast("long")
            .alias("y"),
        )
        .collect()
    )
    a = defaultdict(int)
    df_cnt = defaultdict(int)
    p_tot = sum(r["y"] for r in rows)
    n_docs = len(rows)
    for r in rows:
        for tok in set(r["t"]):
            df_cnt[tok] += 1
            a[tok] += r["y"]

    scored = []
    for tok, dfv in df_cnt.items():
        if dfv < CHI2_MIN_DF:
            continue
        av = a[tok]
        b = dfv - av
        c = p_tot - av
        d = n_docs - p_tot - b
        if dfv > 0 and n_docs - dfv > 0 and p_tot > 0 and n_docs - p_tot > 0:
            det = float(av) * d - float(b) * c
            chi2 = floor(
                (float(n_docs) * det * det)
                / (
                    float(dfv)
                    * (float(n_docs) - dfv)
                    * float(p_tot)
                    * (float(n_docs) - p_tot)
                )
                * 1000.0
            )
        else:
            chi2 = 0
        scored.append((tok, dfv, av, b, chi2))
    scored.sort(key=lambda x: (-x[4], x[0]))
    want = scored[:CHI2_TOPK]

    got = [
        (r["tok"], r["df"], r["n_pos"], r["n_neg"], r["chi2_e3"])
        for r in q_chi2_select(spark, SF_SMOKE).collect()
    ]
    assert got == want
    assert all(x[1] == x[2] + x[3] for x in got)
    assert all(x[1] >= CHI2_MIN_DF for x in got)
    assert len({x[4] for x in got}) >= 5
    assert got[0][4] > 0


def test_source_burrows_delta_matches_python_replica(spark):
    """Burrows' Delta recomputed in exact Python (e6 integer
    frequencies, IEEE z in identical op order, per-term e6 floors)
    from the Spark-tokenized stream: exact row equality.  Also locks:
    all source pairs present (C(n,2) rows), n_terms == BURROWS_K
    everywhere, Delta symmetry-by-construction (a < b ordering), and
    discriminative spread (≥5 distinct deltas)."""
    from collections import defaultdict
    from math import floor, sqrt

    from pyspark.sql import functions as F

    from rxtls_spark.queries_training import (
        BURROWS_K,
        _docs,
        _lm_tokens,
        q_source_burrows_delta,
    )
    from tests.conftest import SF_SMOKE

    rows = (
        _docs(spark, SF_SMOKE)
        .where(F.trim("text") != "")
        .select("source", _lm_tokens().alias("t"))
        .collect()
    )
    cnt = defaultdict(int)
    st = defaultdict(int)
    tot = defaultdict(int)
    for r in rows:
        for tok in r["t"]:
            cnt[tok] += 1
            st[(r["source"], tok)] += 1
            tot[r["source"]] += 1
    markers = [
        t
        for t, _ in sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[
            :BURROWS_K
        ]
    ]
    sources = sorted(tot)
    f = {
        (s, m): (st.get((s, m), 0) * 1000000) // tot[s]
        for s in sources
        for m in markers
    }
    z = {}
    for m in markers:
        n = len(sources)
        sum_f = sum(f[(s, m)] for s in sources)
        sum_f2 = sum(f[(s, m)] ** 2 for s in sources)
        var_num = float(sum_f2) - (float(sum_f) * sum_f) / n
        for s in sources:
            if var_num > 0.0:
                z[(s, m)] = (float(f[(s, m)]) - float(sum_f) / n) / sqrt(
                    var_num / n
                )
            else:
                z[(s, m)] = 0.0
    want = {}
    for i, sa in enumerate(sources):
        for sb in sources[i + 1 :]:
            sdz = sum(
                floor(abs(z[(sa, m)] - z[(sb, m)]) * 1000000.0)
                for m in markers
            )
            want[(sa, sb)] = (BURROWS_K, sdz, sdz // BURROWS_K)

    got = {
        (r["source_a"], r["source_b"]): (
            r["n_terms"],
            r["sum_dz_e6"],
            r["delta_e6"],
        )
        for r in q_source_burrows_delta(spark, SF_SMOKE).collect()
    }
    assert got == want
    n = len(sources)
    assert len(got) == n * (n - 1) // 2
    assert all(v[0] == BURROWS_K for v in got.values())
    assert len({v[2] for v in got.values()}) >= 5


def test_texttiling_matches_python_replica(spark):
    """TextTiling recomputed in Python (exact integer dot/norms, IEEE
    sqrt/÷ in identical op order, prefix/suffix-max envelope) from
    the Spark-tokenized stream: exact row equality including the
    boundary-list md5.  Also locks: the scoring plan is a pure map
    (0 exchanges), single-block docs emit the (0 gaps, md5(''))
    row, identical adjacent blocks floor to exactly 100000, and the
    smoke corpus exercises BOTH the boundary and no-boundary paths."""
    import hashlib
    from math import floor, sqrt

    from pyspark.sql import functions as F

    from rxtls_spark.plans.checks import count_exchanges
    from rxtls_spark.queries_training import (
        TT_DEPTH_CUT,
        TT_W,
        _docs,
        _lm_tokens,
        q_texttiling_segments,
    )
    from tests.conftest import SF_SMOKE

    rows = (
        _docs(spark, SF_SMOKE)
        .where(F.trim("text") != "")
        .select("doc_id", _lm_tokens().alias("t"))
        .collect()
    )

    def block(t, i):  # 1-based block index
        return t[(i - 1) * TT_W : i * TT_W]

    want = {}
    for r in rows:
        t = r["t"]
        n = len(t)
        g = (n + TT_W - 1) // TT_W - 1
        sims = []
        for i in range(1, g + 1):
            a, b = block(t, i), block(t, i + 1)
            dot = sum(b.count(x) for x in a)
            na = sum(a.count(x) for x in a)
            nb = sum(b.count(x) for x in b)
            sims.append(
                floor(float(dot) / sqrt(float(na) * nb) * 100000.0)
            )
        depths = [
            (max(sims[:i]) - sims[i - 1]) + (max(sims[i - 1 :]) - sims[i - 1])
            for i in range(1, len(sims) + 1)
        ]
        bounds = [i for i in range(1, len(depths) + 1)
                  if depths[i - 1] > TT_DEPTH_CUT]
        want[r["doc_id"]] = (
            n,
            g + 1,
            len(depths),
            len(bounds),
            max(depths) if depths else 0,
            depths.index(max(depths)) + 1 if depths else 0,
            hashlib.md5(",".join(str(b) for b in bounds).encode())
            .hexdigest(),
        )

    df = q_texttiling_segments(spark, SF_SMOKE)
    assert count_exchanges(df) == 0
    got = {
        r["doc_id"]: (
            r["n_tokens"],
            r["n_blocks"],
            r["n_gaps"],
            r["n_bounds"],
            r["max_depth_e5"],
            r["best_gap"],
            r["bounds_md5"],
        )
        for r in df.collect()
    }
    assert got == want
    assert any(v[3] > 0 for v in want.values()), "no boundaries fired"
    assert any(
        v[3] == 0 for v in want.values()
    ), "every doc fired a boundary — cut not discriminative"


def test_token_burstiness_matches_python_replica(spark):
    """Burstiness recomputed in exact Python (ints + math.log floor on
    the identical rational) from the Spark-tokenized stream: exact
    row equality.  Also locks: cf ≥ df always, katz/mu integer
    identities, the never-repeating class floors to burst 0, and the
    smoke corpus spreads burst over ≥5 distinct values with a
    genuinely bursty top (cf > df)."""
    from collections import defaultdict
    from math import floor, log

    from pyspark.sql import functions as F

    from rxtls_spark.queries_training import (
        BURST_MIN_CF,
        BURST_TOPK,
        _docs,
        _lm_tokens,
        q_token_burstiness,
    )
    from tests.conftest import SF_SMOKE

    rows = (
        _docs(spark, SF_SMOKE)
        .where(F.trim("text") != "")
        .select(_lm_tokens().alias("t"))
        .collect()
    )
    cf = defaultdict(int)
    df_cnt = defaultdict(int)
    for r in rows:
        seen = set()
        for tok in r["t"]:
            cf[tok] += 1
            if tok not in seen:
                seen.add(tok)
                df_cnt[tok] += 1
    scored = []
    for tok, c in cf.items():
        if c < BURST_MIN_CF:
            continue
        d = df_cnt[tok]
        scored.append(
            (
                tok,
                c,
                d,
                floor(log(float(c) / float(d)) * 1000.0),
                ((c - d) * 1000000) // c,
                (c * 1000) // d,
            )
        )
    scored.sort(key=lambda x: (-x[3], x[0]))
    want = scored[:BURST_TOPK]

    got = [
        (r["tok"], r["cf"], r["df"], r["burst_e3"], r["katz_e6"], r["mu_e3"])
        for r in q_token_burstiness(spark, SF_SMOKE).collect()
    ]
    assert got == want
    assert all(c >= d for _, c, d, *_ in got)
    assert len({x[3] for x in got}) >= 5
    assert got[0][1] > got[0][2], "top token must actually repeat"


def test_rocchio_expand_matches_python_replica(spark):
    """Rocchio PRF recomputed in exact Python (ints + math.log floor
    in the identical expression order) from the Spark bm25 feedback
    set and tokenized stream: exact row equality.  Also locks: the
    feedback set is exactly bm25's top-R, query terms carry the α
    bonus, df ≥ 1 everywhere (feedback ⊂ corpus), and the expansion
    actually surfaces non-query terms."""
    from collections import defaultdict
    from math import floor, log

    from pyspark.sql import functions as F

    from rxtls_spark.queries_training import (
        BM25_N_TERMS,
        ROCCHIO_ALPHA_E3,
        ROCCHIO_BETA_E3,
        ROCCHIO_R,
        ROCCHIO_TOPK,
        _docs,
        _lm_tokens,
        q_bm25_topk,
        q_rocchio_expand,
    )
    from tests.conftest import SF_SMOKE

    rows = (
        _docs(spark, SF_SMOKE)
        .where(F.trim("text") != "")
        .select("doc_id", _lm_tokens().alias("t"))
        .collect()
    )
    fb = {
        r["doc_id"]
        for r in q_bm25_topk(spark, SF_SMOKE).collect()
        if r["rank"] <= ROCCHIO_R
    }
    assert len(fb) == ROCCHIO_R
    cnt = defaultdict(int)
    sum_tf = defaultdict(int)
    df_cnt = defaultdict(int)
    n_docs = len(rows)
    for r in rows:
        for tok in r["t"]:
            cnt[tok] += 1
            if r["doc_id"] in fb:
                sum_tf[tok] += 1
        for tok in set(r["t"]):
            df_cnt[tok] += 1
    qterms = {
        t
        for t, _ in sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[
            :BM25_N_TERMS
        ]
    }
    scored = []
    for tok, stf in sum_tf.items():
        d = df_cnt[tok]
        fb_e3 = floor(
            (float(stf) / float(ROCCHIO_R))
            * log(float(n_docs) / float(d)) * 1000.0
        )
        is_q = 1 if tok in qterms else 0
        score = ROCCHIO_ALPHA_E3 * is_q + (ROCCHIO_BETA_E3 * fb_e3) // 1000
        scored.append((tok, is_q, stf, d, fb_e3, score))
    scored.sort(key=lambda x: (-x[5], x[0]))
    want = scored[:ROCCHIO_TOPK]

    got = [
        (r["tok"], r["is_q"], r["sum_tf"], r["df"], r["fb_e3"],
         r["score_e3"])
        for r in q_rocchio_expand(spark, SF_SMOKE).collect()
    ]
    assert got == want
    assert all(x[3] >= 1 for x in got)
    assert any(x[1] == 0 for x in got), "expansion must add new terms"


def test_lang_source_cramer_matches_python_replica(spark):
    """Cramér's V recomputed in exact Python (ints + IEEE doubles in
    identical op order, per-cell e6 floors) from the collected
    (lang, source) pairs: exact equality.  Also locks: margins sum to
    N, V in [0, 1e6], and V > 0 (the synthetic corpus skews language
    by source, so independence must be rejected)."""
    from collections import Counter
    from math import floor, sqrt

    from rxtls_spark.queries_training import _docs, q_lang_source_cramer
    from tests.conftest import SF_SMOKE

    pairs = [
        (r["lang"], r["source"])
        for r in _docs(spark, SF_SMOKE).select("lang", "source").collect()
    ]
    cells = Counter(pairs)
    row_n = Counter(l for l, _ in pairs)
    col_n = Counter(s for _, s in pairs)
    n = len(pairs)
    chi2_e6 = 0
    for (l, s), o in cells.items():
        e = (float(row_n[l]) * col_n[s]) / n
        chi2_e6 += floor((float(o) - e) * (float(o) - e) / e * 1000000.0)
    k = min(len(row_n), len(col_n))
    v_e6 = (
        floor(sqrt((float(chi2_e6) / 1000000.0) / (float(n) * (k - 1)))
              * 1000000.0)
        if k > 1
        else 0
    )

    rows = q_lang_source_cramer(spark, SF_SMOKE).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (
        r["n_docs"],
        r["n_langs"],
        r["n_sources"],
        r["chi2_e6"],
        r["v_e6"],
    ) == (n, len(row_n), len(col_n), chi2_e6, v_e6)
    assert sum(row_n.values()) == n == sum(col_n.values())
    assert 0 < r["v_e6"] <= 1_000_000


def test_source_jsd_matches_python_replica(spark):
    """JSD recomputed in exact Python (md5 buckets, IEEE double A/B
    products + math.log floors in identical op order, exact integer
    weighted sums and truncating DIVs) from the collected corpus:
    exact row equality.  Also locks: jsd_e3 within the [−2, 694]
    floored-[0, ln2] band, symmetry of the construction (p_num and
    q_num both present), and cross-source spread (≥5 distinct
    values)."""
    import hashlib
    from collections import defaultdict
    from math import floor, log

    from pyspark.sql import functions as F

    from rxtls_spark.queries_training import (
        _docs,
        _lm_tokens,
        q_source_jsd,
    )
    from tests.conftest import SF_SMOKE

    def tdiv(a, b):
        q = abs(a) // abs(b)
        return q if (a >= 0) == (b > 0) else -q

    rows = (
        _docs(spark, SF_SMOKE)
        .where(F.trim("text") != "")
        .select("source", _lm_tokens().alias("t"))
        .collect()
    )
    cnt = defaultdict(int)
    for r in rows:
        for tk in r["t"]:
            h = hashlib.md5(tk.encode()).hexdigest()
            b = (int(h[0], 16) * 16 + int(h[1], 16)) % 64
            cnt[(r["source"], b)] += 1
    sources = {s for s, _ in cnt}
    ns = {s: sum(cnt.get((s, b), 0) for b in range(64)) for s in sources}
    cb = {b: sum(cnt.get((s, b), 0) for s in sources) for b in range(64)}
    n = sum(ns.values())

    want = {}
    for s in sources:
        p_num = q_num = 0
        for b in range(64):
            c = cnt.get((s, b), 0)
            a_v = float(c + 1) * (n + 64)
            b_v = float(cb[b] + 1) * (ns[s] + 64)
            lnpm = floor(log((2.0 * a_v) / (a_v + b_v)) * 1000.0)
            lnqm = floor(log((2.0 * b_v) / (a_v + b_v)) * 1000.0)
            p_num += (c + 1) * lnpm
            q_num += (cb[b] + 1) * lnqm
        jsd = tdiv(tdiv(p_num, ns[s] + 64) + tdiv(q_num, n + 64), 2)
        want[s] = (ns[s], p_num, q_num, jsd)

    got = {
        r["source"]: (r["n_tokens"], r["p_num"], r["q_num"], r["jsd_e3"])
        for r in q_source_jsd(spark, SF_SMOKE).collect()
    }
    assert got == want
    for v in got.values():
        assert -2 <= v[3] <= 694
    assert len({v[3] for v in got.values()}) >= 5


def test_compression_ratio_matches_zlib_exactly(spark):
    """zlib-6 lengths recomputed directly in Python: exact byte
    equality per doc (the content_hashes byte-lock pattern for
    non-SQL ops).  Also locks: the plan is ONE ArrowEvalPython with
    0 exchanges (the UDF is planned once — nondeterministic mark),
    ratio/gate integer identities, compression always wins on this
    corpus (z < n), and the gate is discriminative (some docs
    templated, some not)."""
    import zlib

    from pyspark.sql import functions as F

    from rxtls_spark.plans.checks import count_exchanges, plan_string
    from rxtls_spark.queries_training import (
        COMPRESS_GATE_E3,
        _docs,
        q_compression_ratio,
    )
    from tests.conftest import SF_SMOKE

    df = q_compression_ratio(spark, SF_SMOKE)
    assert count_exchanges(df) == 0
    plan = plan_string(df, mode="simple")
    assert plan.count("ArrowEvalPython") == 1, plan

    texts = {
        r["doc_id"]: r["text"]
        for r in _docs(spark, SF_SMOKE)
        .where(F.trim("text") != "")
        .select("doc_id", "text")
        .collect()
    }
    got = {r["doc_id"]: r for r in df.collect()}
    assert set(got) == set(texts)
    n_gate = 0
    for did, t in texts.items():
        r = got[did]
        n = len(t.encode("utf-8"))
        z = len(zlib.compress(t.encode("utf-8"), 6))
        assert (r["n_bytes"], r["z_bytes"]) == (n, z), did
        assert r["ratio_e3"] == (n * 1000) // z
        assert r["is_templated"] == (
            1 if (n * 1000) // z >= COMPRESS_GATE_E3 else 0
        )
        if n >= 200:  # tiny docs pay the zlib header (ratio < 1 is real)
            assert z < n, did
        n_gate += r["is_templated"]
    assert 0 < n_gate < len(texts), "gate not discriminative"


def test_source_minhash_jaccard_matches_python_replica(spark):
    """Sketch-vs-truth recomputed in exact Python (md5-13-hex keys,
    the calibration permutation family, exact set intersections)
    from the Spark-tokenized stream: exact row equality.  Also
    locks: C(n,2) pair coverage, jacc/est bounds, the unbiasedness
    sanity mean(|err|) < 3·sd(J=0.5)·1e5, and that exact Jaccard
    actually varies across pairs."""
    from collections import defaultdict
    from hashlib import md5

    from pyspark.sql import functions as F

    from rxtls_spark.functions.hashing import KNUTH_A, KNUTH_P
    from rxtls_spark.queries_training import (
        CAL_PERMS,
        CAL_STEP,
        _docs,
        _lm_tokens,
        q_source_minhash_jaccard,
    )
    from tests.conftest import SF_SMOKE

    rows = (
        _docs(spark, SF_SMOKE)
        .where(F.trim("text") != "")
        .select("source", _lm_tokens().alias("t"))
        .collect()
    )
    sets = defaultdict(set)
    for r in rows:
        sets[r["source"]].update(r["t"])
    sig = {}
    for s, toks in sets.items():
        xs = [int(md5(t.encode()).hexdigest()[:13], 16) for t in toks]
        sig[s] = [
            min((((x + k * CAL_STEP) % KNUTH_P) * KNUTH_A) % KNUTH_P
                for x in xs)
            for k in range(CAL_PERMS)
        ]
    srcs = sorted(sets)
    want = {}
    for i, a in enumerate(srcs):
        for b in srcs[i + 1 :]:
            inter = len(sets[a] & sets[b])
            union = len(sets[a]) + len(sets[b]) - inter
            jacc = (inter * 100000) // union
            m = sum(
                1 for k in range(CAL_PERMS) if sig[a][k] == sig[b][k]
            )
            est = (m * 100000) // CAL_PERMS
            want[(a, b)] = (
                len(sets[a]),
                len(sets[b]),
                inter,
                jacc,
                m,
                est,
                est - jacc,
            )

    got = {
        (r["source_a"], r["source_b"]): (
            r["n_a"],
            r["n_b"],
            r["inter"],
            r["jacc_e5"],
            r["matches"],
            r["est_e5"],
            r["err_e5"],
        )
        for r in q_source_minhash_jaccard(spark, SF_SMOKE).collect()
    }
    assert got == want
    n = len(srcs)
    assert len(got) == n * (n - 1) // 2
    for v in got.values():
        assert 0 <= v[3] <= 100000 and 0 <= v[5] <= 100000
    errs = [abs(v[6]) for v in got.values()]
    assert sum(errs) / len(errs) < 3 * 12500  # 3·sd at J=.5, 16 perms
    # the ~60-token synthetic vocab saturates source vocabularies
    # (J ≈ 0.97-1.0 at smoke scale) — ≥2 distinct values proves the
    # exact side discriminates at all; real corpora spread wide
    assert len({v[3] for v in got.values()}) >= 2


def test_sgns_embeddings_matches_independent_replica(spark):
    """SGNS recomputed from scratch in the test (its own cooc
    counting over the Spark-tokenized stream, its own pair/negative
    construction, its own training loop with the 6-dp floor rule):
    exact row equality with the query output.  Also locks: ranks are
    the 1..V alphabetical enumeration, V·D rows, training MOVED the
    parameters off their init, and the full-batch loss strictly
    decreases across the run (it is gradient descent)."""
    from collections import defaultdict
    from math import exp, floor, log

    from pyspark.sql import functions as F

    from rxtls_spark.queries_training import (
        COOC_VOCAB_K,
        COOC_W,
        SGNS_DIM,
        SGNS_ITERS,
        SGNS_NEG_JUMP,
        _docs,
        _lm_tokens,
        q_sgns_embeddings,
    )
    from tests.conftest import SF_SMOKE

    rows = (
        _docs(spark, SF_SMOKE)
        .where(F.trim("text") != "")
        .select(_lm_tokens().alias("t"))
        .collect()
    )
    cnt = defaultdict(int)
    for r in rows:
        for tk in r["t"]:
            cnt[tk] += 1
    vocab = {
        t
        for t, _ in sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[
            :COOC_VOCAB_K
        ]
    }
    cab = defaultdict(int)
    for r in rows:
        t = r["t"]
        for d in range(1, COOC_W + 1):
            for i in range(len(t) - d):
                x, y = t[i], t[i + d]
                if x in vocab and y in vocab and x != y:
                    cab[(min(x, y), max(x, y))] += 1

    nodes = sorted({a for a, _ in cab} | {b for _, b in cab})
    vn = len(nodes)
    rank = {t: i + 1 for i, t in enumerate(nodes)}
    pairs = []
    for (a, b), w in cab.items():
        for c, o in ((a, b), (b, a)):
            pairs.append((c, o, w, 1.0))
            pairs.append(
                (c, nodes[(rank[o] - 1 + SGNS_NEG_JUMP) % vn], w, 0.0)
            )
    w_tot = sum(w for _, _, w, _ in pairs)

    def kn(x):
        return ((x % 1000000007) * 2654435761) % 1000000007

    v = {
        t: [
            (kn((rank[t] - 1) * 2 * SGNS_DIM + d) % 2001 - 1000) / 1000000.0
            for d in range(SGNS_DIM)
        ]
        for t in nodes
    }
    u = {
        t: [
            (kn((rank[t] - 1) * 2 * SGNS_DIM + SGNS_DIM + d) % 2001 - 1000)
            / 1000000.0
            for d in range(SGNS_DIM)
        ]
        for t in nodes
    }
    init_v = {t: list(x) for t, x in v.items()}

    def loss():
        tot = 0.0
        for c, o, w, y in pairs:
            dot = sum(v[c][d] * u[o][d] for d in range(SGNS_DIM))
            p = 1.0 / (1.0 + exp(-dot))
            p = min(max(p, 1e-12), 1 - 1e-12)
            tot += w * -(y * log(p) + (1 - y) * log(1 - p))
        return tot / w_tot

    losses = [loss()]
    for _ in range(SGNS_ITERS):
        gv = {t: [0.0] * SGNS_DIM for t in nodes}
        gu = {t: [0.0] * SGNS_DIM for t in nodes}
        for c, o, w, y in pairs:
            dot = 0.0
            for d in range(SGNS_DIM):
                dot += v[c][d] * u[o][d]
            err = 1.0 / (1.0 + exp(-dot)) - y
            for d in range(SGNS_DIM):
                gv[c][d] += w * err * u[o][d]
                gu[o][d] += w * err * v[c][d]
        for t in nodes:
            for d in range(SGNS_DIM):
                v[t][d] -= 0.5 * (
                    floor(gv[t][d] / w_tot * 1000000 + 0.5) / 1000000
                )
                u[t][d] -= 0.5 * (
                    floor(gu[t][d] / w_tot * 1000000 + 0.5) / 1000000
                )
        losses.append(loss())

    want = {}
    for t in nodes:
        for d in range(SGNS_DIM):
            want[(t, d)] = (
                rank[t],
                floor(v[t][d] * 1000000 + 0.5),
                floor(u[t][d] * 1000000 + 0.5),
            )

    got = {
        (r["token"], r["dim"]): (r["rank"], r["v_e6"], r["u_e6"])
        for r in q_sgns_embeddings(spark, SF_SMOKE).collect()
    }
    assert got == want
    assert len(got) == vn * SGNS_DIM
    assert sorted({r for r, _, _ in got.values()}) == list(range(1, vn + 1))
    assert any(
        abs(v[t][d] - init_v[t][d]) > 1e-9
        for t in nodes
        for d in range(SGNS_DIM)
    ), "training never moved"
    assert all(
        b < a for a, b in zip(losses, losses[1:])
    ), f"loss must strictly decrease: {losses}"


def test_qlm_topk_matches_python_replica(spark):
    """Dirichlet QLM recomputed in exact Python (integer-rational
    smoothed probabilities, math.log e3 floors per term in the fixed
    term order) from the Spark-tokenized stream: exact top-k row
    equality including ranks.  Also locks: scores are negative
    (log-probs), longer docs are not trivially favored (the
    Dirichlet normalization), and the ranking differs from raw
    doc length order somewhere (the model is not degenerate)."""
    from collections import defaultdict
    from math import floor, log

    from pyspark.sql import functions as F

    from rxtls_spark.queries_training import (
        BM25_N_TERMS,
        BM25_TOPK,
        QLM_MU,
        _docs,
        _lm_tokens,
        q_qlm_topk,
    )
    from tests.conftest import SF_SMOKE

    rows = (
        _docs(spark, SF_SMOKE)
        .where(F.trim("text") != "")
        .select("doc_id", _lm_tokens().alias("t"))
        .collect()
    )
    cnt = defaultdict(int)
    n_tot = 0
    for r in rows:
        for tk in r["t"]:
            cnt[tk] += 1
            n_tot += 1
    terms = [
        t
        for t, _ in sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[
            :BM25_N_TERMS
        ]
    ]
    scored = []
    for r in rows:
        t = r["t"]
        dl = len(t)
        s = 0
        for q in terms:
            tf = sum(1 for x in t if x == q)
            num = tf * n_tot + QLM_MU * cnt[q]
            den = n_tot * (dl + QLM_MU)
            s += floor(log(float(num) / float(den)) * 1000.0)
        scored.append((r["doc_id"], dl, s))
    scored.sort(key=lambda x: (-x[2], x[0]))
    want = [
        (d, dl, s, k + 1) for k, (d, dl, s) in enumerate(scored[:BM25_TOPK])
    ]

    got = [
        (r["doc_id"], r["n_tokens"], r["score_e3"], r["rank"])
        for r in q_qlm_topk(spark, SF_SMOKE).collect()
    ]
    assert got == want
    assert all(s < 0 for _, _, s, _ in got)
    by_len = sorted(got, key=lambda x: -x[1])
    assert [x[0] for x in by_len] != [x[0] for x in got], (
        "ranking degenerated to doc length"
    )


def test_ppmi_svd_matches_independent_replica(spark):
    """PPMI power iteration recomputed from scratch in the test (own
    cooc counting, own PPMI matrix, own deflated power loop with the
    6-dp floor rule): exact row equality.  Also locks the
    eigen-structure: λ1 > 0 dominant by magnitude (|λ2| ≤ λ1,
    λ2 ≠ 0 — PPMI is INDEFINITE, so the second pair may carry a
    negative eigenvalue; power iteration finds largest |λ|), both
    iterates unit-norm within the rounding grid, and
    near-orthogonality |v1·v2| < 0.01 (the deflation actually
    removed the first component)."""
    from collections import defaultdict
    from math import floor, log, sqrt

    from pyspark.sql import functions as F

    from rxtls_spark.queries_training import (
        COOC_VOCAB_K,
        COOC_W,
        PSVD_ITERS,
        _docs,
        _lm_tokens,
        q_ppmi_svd,
    )
    from tests.conftest import SF_SMOKE

    rows = (
        _docs(spark, SF_SMOKE)
        .where(F.trim("text") != "")
        .select(_lm_tokens().alias("t"))
        .collect()
    )
    cnt = defaultdict(int)
    for r in rows:
        for tk in r["t"]:
            cnt[tk] += 1
    vocab = {
        t
        for t, _ in sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[
            :COOC_VOCAB_K
        ]
    }
    cab = defaultdict(int)
    for r in rows:
        t = r["t"]
        for d in range(1, COOC_W + 1):
            for i in range(len(t) - d):
                x, y = t[i], t[i + d]
                if x in vocab and y in vocab:
                    cab[(min(x, y), max(x, y))] += 1
    marg = defaultdict(int)
    for (a, b), c in cab.items():
        marg[a] += c
        marg[b] += c
    n_pairs = sum(cab.values())
    nodes = sorted(marg)
    rank = {t: i + 1 for i, t in enumerate(nodes)}
    edges = {t: [] for t in nodes}
    for (a, b), c in cab.items():
        v = log((float(c) * n_pairs) / (float(marg[a]) * marg[b]))
        if v > 0.0:
            edges[a].append((b, v))
            if a != b:
                edges[b].append((a, v))

    def kn(x):
        return ((x % 1000000007) * 2654435761) % 1000000007

    def stable6(x):
        return floor(x * 1000000 + 0.5) / 1000000

    def power(defl):
        v_init = {t: (kn(rank[t]) % 2001 - 1000) / 1000000.0 for t in nodes}
        v = dict(v_init)
        for _ in range(PSVD_ITERS):
            w = {t: 0.0 for t in nodes}
            for a in nodes:
                va = v[a]
                for b, m in edges[a]:
                    w[b] += m * va
            if defl is not None:
                lam, v1 = defl
                dot = sum(v1[t] * v[t] for t in nodes)
                for t in nodes:
                    w[t] -= lam * v1[t] * dot
            nrm = sqrt(sum(x * x for x in w.values()))
            if nrm > 0.0:
                v = {t: stable6(w[t] / nrm) for t in nodes}
            else:
                v = dict(v_init)
        num = 0.0
        for a in nodes:
            for b, m in edges[a]:
                num += v[a] * m * v[b]
        if defl is not None:
            lam, v1 = defl
            dot = sum(v1[t] * v[t] for t in nodes)
            num -= lam * dot * dot
        return v, floor(num * 1000000 + 0.5)

    v1, l1 = power(None)
    v2, l2 = power((l1 / 1000000.0, v1))
    want = {}
    for t in nodes:
        want[(t, 1)] = (rank[t], floor(v1[t] * 1000000 + 0.5), l1)
        want[(t, 2)] = (rank[t], floor(v2[t] * 1000000 + 0.5), l2)

    got = {
        (r["token"], r["comp"]): (r["rank"], r["val_e6"], r["lambda_e6"])
        for r in q_ppmi_svd(spark, SF_SMOKE).collect()
    }
    assert got == want
    assert l1 > 0 and l2 != 0 and abs(l2) <= l1
    for v in (v1, v2):
        nrm = sum(x * x for x in v.values())
        assert abs(nrm - 1.0) < 1e-3
    dot = sum(v1[t] * v2[t] for t in nodes)
    assert abs(dot) < 0.01, dot


def test_vocab_richness_matches_python_replica(spark):
    """Exact-integer replica of Yule's K / Herdan's C / hapax per
    source from the collected smoke texts: same tokenizer, Python
    bignum S2 (no overflow by construction), integer // for K and
    hapax_e6, floored ln-ratio for herdan — row-for-row equality.
    Also locks the spectrum identities V1 + V2 <= V <= N and
    K > 0 (S2 > N whenever any type repeats)."""
    import math
    import re
    from collections import Counter

    from rxtls_spark.queries_training import q_vocab_richness
    from tests.conftest import SF_SMOKE

    per_src: dict[str, Counter] = {}
    for r in (
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .select("source", "text")
        .collect()
    ):
        if not r["text"].strip():
            continue
        toks = re.split("[ \t\n\x0B\f\r]+", r["text"].strip().lower())
        per_src.setdefault(r["source"], Counter()).update(toks)

    want = {}
    for src, cnt in per_src.items():
        n = sum(cnt.values())
        v = len(cnt)
        v1 = sum(1 for c in cnt.values() if c == 1)
        v2 = sum(1 for c in cnt.values() if c == 2)
        s2 = sum(c * c for c in cnt.values())
        herdan = (
            math.floor(math.log(v) / math.log(n) * 100000.0)
            if v > 1 and n > 1
            else 0
        )
        want[src] = (
            n,
            v,
            v1,
            v2,
            ((s2 - n) * 10**10) // (n * n),
            (v1 * 10**6) // v,
            herdan,
        )

    got = q_vocab_richness(spark, SF_SMOKE).collect()
    assert len(got) == len(want)
    for r in got:
        n, v, v1, v2, k, he6, hc = want[r["source"]]
        assert r["n_tokens"] == n
        assert r["n_types"] == v
        assert r["hapax"] == v1
        assert r["dis"] == v2
        assert r["yule_k_e6"] == k
        assert r["hapax_e6"] == he6
        assert r["herdan_e5"] == hc
        assert v1 + v2 <= v <= n
        assert k > 0


def test_grand_prune_matches_python_replica_and_bounds(spark):
    """grand_e3/el2n_e3 recomputed in Python (math.exp/sqrt over the
    trained weights and engine features — identical float expression
    order), the kept set is the exact fixed-k (grand DESC, doc_id)
    selection, and the paper identities hold row-wise: grand >= el2n
    (feature norm >= 1) and grand <= 2*el2n + 1 (norm <= 2 on these
    bounded features).  Also locks that the two rankings actually
    DISAGREE somewhere (the feature-norm effect is the point)."""
    import math

    from rxtls_spark.queries_training import (
        GRAND_K,
        _logreg_train,
        logreg_features,
        q_grand_prune,
    )
    from tests.conftest import SF_SMOKE

    fx = logreg_features(spark.read.parquet(f"{SF_SMOKE}/documents.parquet"))
    feats = {
        r["doc_id"]: (r["x1"], r["x2"], r["x3"], r["y"]) for r in fx.collect()
    }
    _, wv = _logreg_train(fx)
    want = {}
    for d, (x1, x2, x3, y) in feats.items():
        m = wv[0] * 1.0 + wv[1] * x1 + wv[2] * x2 + wv[3] * x3
        p = 1.0 / (1.0 + math.exp(-m))
        nrm = math.sqrt(1.0 + x1 * x1 + x2 * x2 + x3 * x3)
        want[d] = (
            math.floor(abs(p - y) * nrm * 1000 + 0.5),
            math.floor(abs(p - y) * 1000 + 0.5),
        )
    kept = sorted(want, key=lambda d: (-want[d][0], d))[:GRAND_K]

    got = q_grand_prune(spark, SF_SMOKE).collect()
    assert len(got) == GRAND_K
    assert {r["doc_id"]: (r["grand_e3"], r["el2n_e3"]) for r in got} == {
        d: want[d] for d in kept
    }
    for r in got:
        assert r["el2n_e3"] <= r["grand_e3"] <= 2 * r["el2n_e3"] + 1
    el2n_kept = sorted(want, key=lambda d: (-want[d][1], d))[:GRAND_K]
    assert set(kept) != set(el2n_kept) or any(
        want[d][0] != want[d][1] for d in kept
    ), "GraNd degenerated to EL2N — feature norm had no effect"


def _py_winnow(toks, k, w):
    """Textbook winnowing (Schleimer 2003): k-gram md5-based hashes,
    rightmost minimum of each full w-window; returns the packed-key
    set the query emits (h35 * 2^20 + 2^20 - 1 - pos, pos 1-based)."""
    import hashlib

    cap = 1 << 20
    n = len(toks) - (k - 1)
    if n < 1:
        return None, set()
    hs = []
    for i in range(n):
        g = " ".join(toks[i : i + k])
        h35 = int(hashlib.md5(g.encode("utf-8")).hexdigest()[:13], 16) % (
            1 << 35
        )
        hs.append(h35)
    sel = set()
    for s in range(max(1, n - w + 1)):
        win = hs[s : s + w]
        mn = min(win)
        pos = s + max(i for i, h in enumerate(win) if h == mn) + 1
        sel.add(mn * cap + cap - 1 - pos)
    return n, sel


def test_winnow_fingerprints_matches_python_replica(spark):
    """Row-for-row equality with the classic sequential winnowing
    algorithm run in Python over the same tokens (proves the packed
    single-BIGINT window MIN implements rightmost-min-on-ties), the
    2/(w+1) density shape (n_fp <= full-window count), and the MOSS
    guarantee on the replica: a copy that drops the first w+k-1
    tokens still shares a fingerprint hash with the original."""
    import hashlib
    import re

    from rxtls_spark.queries_training import (
        WINNOW_K,
        WINNOW_W,
        q_winnow_fingerprints,
    )
    from tests.conftest import SF_SMOKE

    texts = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .select("doc_id", "text")
        .collect()
        if r["text"].strip()
    }
    want = {}
    for d, text in texts.items():
        toks = re.split("[ \t\n\x0B\f\r]+", text.strip().lower())
        n, sel = _py_winnow(toks, WINNOW_K, WINNOW_W)
        if n is not None:
            digest = hashlib.md5(
                ",".join(str(x) for x in sorted(sel)).encode()
            ).hexdigest()
            want[d] = (n, len(sel), digest)

    got = q_winnow_fingerprints(spark, SF_SMOKE).collect()
    assert len(got) == len(want)
    informative = False
    for r in got:
        n, nfp, digest = want[r["doc_id"]]
        assert (r["n_grams"], r["n_fp"], r["fp_md5"]) == (n, nfp, digest)
        assert nfp <= max(1, n - WINNOW_W + 1)
        if 1 < nfp < max(1, n - WINNOW_W + 1):
            informative = True
    assert informative, "winnowing selected everything or nothing"

    # MOSS guarantee on the replica: shared run >= w+k-1 tokens
    # implies a shared fingerprint HASH (position-independent part).
    d0 = max(texts, key=lambda d: len(texts[d]))
    toks = re.split("[ \t\n\x0B\f\r]+", texts[d0].strip().lower())
    assert len(toks) >= 3 * (WINNOW_W + WINNOW_K)
    _, sa = _py_winnow(toks, WINNOW_K, WINNOW_W)
    _, sb = _py_winnow(
        toks[WINNOW_W + WINNOW_K - 1 :], WINNOW_K, WINNOW_W
    )
    cap = 1 << 20
    assert {x // cap for x in sa} & {x // cap for x in sb}


def test_dawid_skene_recovers_injected_error_rates(spark):
    """End-to-end validation of the EM: (1) exact replica — combos
    rebuilt in Python from the gold label + md5-permille flips
    reproduce the query rows bit-for-bit; (2) RECOVERY — the fitted
    sensitivities order as the injected 10/20/30%% error rates and
    each recovered positive-error rate lands within ±120 permille of
    its injection (EM soft-posterior bias + smoke sampling noise);
    (3) the DS posterior's gold accuracy >= majority vote's (the
    reason the estimator exists — it downweights the noisy rater)."""
    import hashlib

    from rxtls_spark.queries_training import (
        DS_ERR,
        _ds_em,
        logreg_features,
        q_dawid_skene,
    )
    from tests.conftest import SF_SMOKE

    gold = {
        r["doc_id"]: int(r["y"])
        for r in logreg_features(
            spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        )
        .select("doc_id", "y")
        .collect()
    }

    def draw(d: int, j: int) -> int:
        h = hashlib.md5(f"ds{j}|{d}".encode()).hexdigest()[:13]
        return int(h, 16) % 1000

    combos = {}
    pattern_gold = {}
    for d, g in gold.items():
        c = tuple(
            1 - g if draw(d, j) < DS_ERR[j] else g for j in range(3)
        )
        combos[c] = combos.get(c, 0) + 1
        pg = pattern_gold.setdefault(c, [0, 0])
        pg[g] += 1
    mu, pi, a, b = _ds_em(combos)

    got = {
        (r["y1"], r["y2"], r["y3"]): r for r in q_dawid_skene(spark, SF_SMOKE).collect()
    }
    assert set(got) == set(combos)
    for c, r in got.items():
        assert r["n_docs"] == combos[c]
        assert r["mu_e6"] == mu[c]
        assert (r["pi_e6"], r["a1_e6"], r["a2_e6"], r["a3_e6"]) == (
            pi,
            a[0],
            a[1],
            a[2],
        )
        assert (r["b1_e6"], r["b2_e6"], r["b3_e6"]) == (b[0], b[1], b[2])

    # recovery: 1 - alpha_j ~= ERR_j (permille), annotators ordered
    assert a[0] > a[1] > a[2]
    for j in range(3):
        rec = (1000000 - a[j]) // 1000
        assert abs(rec - DS_ERR[j]) <= 120, (j, rec, DS_ERR[j])

    # posterior accuracy >= majority vote accuracy against gold
    ds_ok = sum(
        pattern_gold[c][1] if mu[c] >= 500000 else pattern_gold[c][0]
        for c in combos
    )
    mv_ok = sum(
        pattern_gold[c][1] if sum(c) >= 2 else pattern_gold[c][0]
        for c in combos
    )
    assert ds_ok >= mv_ok


def test_t_closeness_matches_python_replica(spark):
    """Exact-integer replica of the ordinal EMD from the collected
    per-doc (QI, quality bucket) pairs: e9 CDFs, |ΔCDF| summed over
    all but the last observed bucket, // (m-1) — row-for-row.  Locks
    the EMD range [0, 1e9], that both verdicts fire on the synthetic
    corpus, and the Li-2007 skew intuition: the mean EMD of singleton
    classes exceeds the mean EMD of the largest classes."""
    from pyspark.sql import functions as F

    from rxtls_spark.queries_training import (
        KANON_LEN_BUCKET,
        T_CLOSE_E9,
        q_t_closeness,
        quality_bucket,
        quality_score,
        _docs,
    )
    from tests.conftest import SF_SMOKE

    rows = (
        _docs(spark, SF_SMOKE)
        .select(
            "source",
            "lang",
            F.expr(f"n_chars DIV {KANON_LEN_BUCKET}").alias("len_bucket"),
            quality_score().alias("quality"),
        )
        .select("source", "lang", "len_bucket", quality_bucket().alias("qb"))
        .collect()
    )
    per_cls: dict = {}
    glob: dict = {}
    for r in rows:
        key = (r["source"], r["lang"], r["len_bucket"])
        per_cls.setdefault(key, {}).setdefault(r["qb"], 0)
        per_cls[key][r["qb"]] += 1
        glob[r["qb"]] = glob.get(r["qb"], 0) + 1
    bks = sorted(glob)
    m = len(bks)
    n_tot = sum(glob.values())
    gcdf, cum = [], 0
    for b in bks:
        cum += glob[b]
        gcdf.append(cum * 10**9 // n_tot)
    want = {}
    for key, h in per_cls.items():
        n_c = sum(h.values())
        cum_c, sum_d = 0, 0
        for i, b in enumerate(bks):
            cum_c += h.get(b, 0)
            if i < m - 1:
                sum_d += abs(cum_c * 10**9 // n_c - gcdf[i])
        emd = sum_d // (m - 1) if m > 1 else 0
        want[key] = (n_c, emd, "suppress_t" if emd > T_CLOSE_E9 else "ok")

    got = q_t_closeness(spark, SF_SMOKE).collect()
    assert len(got) == len(want)
    verdicts = set()
    for r in got:
        key = (r["source"], r["lang"], r["len_bucket"])
        assert (r["n_docs"], r["emd_e9"], r["verdict"]) == want[key], key
        assert 0 <= r["emd_e9"] <= 10**9
        verdicts.add(r["verdict"])
    assert verdicts == {"ok", "suppress_t"}

    singles = [e for n, e, _ in want.values() if n == 1]
    big_n = sorted(n for n, _, _ in want.values())[-5]
    bigs = [e for n, e, _ in want.values() if n >= big_n]
    assert singles and bigs
    assert sum(singles) / len(singles) > sum(bigs) / len(bigs)


def test_branching_entropy_matches_python_replica(spark):
    """Exact replica of both branching entropies / accessor varieties
    from the collected texts (same tokenizer, e3-ln floor fold,
    (c_left DESC, tok) top-k, coalesce-0 right side), plus the
    structural locks: entropy bounds 0 <= ent_e3 <= ln(av)·1e3 (max
    entropy is the uniform distribution) and identity Σ_b c(a,b) =
    c_left(a)."""
    import math
    import re
    from collections import Counter

    from rxtls_spark.queries_training import (
        BRANCH_TOPK,
        q_branching_entropy,
    )
    from tests.conftest import SF_SMOKE

    cab = Counter()
    for r in (
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .select("text")
        .collect()
    ):
        if not r["text"].strip():
            continue
        t = re.split("[ \t\n\x0B\f\r]+", r["text"].strip().lower())
        for i in range(len(t) - 1):
            cab[(t[i], t[i + 1])] += 1

    def side(idx):
        marg = Counter()
        for k, c in cab.items():
            marg[k[idx]] += c
        stats = {}
        for tok in marg:
            ne3 = 0
            av = 0
            for k, c in cab.items():
                if k[idx] == tok:
                    av += 1
                    ne3 += -c * math.floor(
                        math.log(c / float(marg[tok])) * 1000.0
                    )
            stats[tok] = (marg[tok], av, ne3 // marg[tok])
        return stats

    ls, rs = side(0), side(1)
    top = sorted(ls, key=lambda t: (-ls[t][0], t))[:BRANCH_TOPK]

    got = q_branching_entropy(spark, SF_SMOKE).collect()
    assert len(got) == len(top)
    assert {r["tok"] for r in got} == set(top)
    for r in got:
        cl, avr, entr = ls[r["tok"]]
        cr, avl, entl = rs.get(r["tok"], (0, 0, 0))
        assert (r["c_left"], r["av_r"], r["ent_r_e3"]) == (cl, avr, entr)
        assert (r["c_right"], r["av_l"], r["ent_l_e3"]) == (cr, avl, entl)
        assert 0 <= entr <= math.log(max(avr, 1)) * 1000 + 1000
        if cr:
            assert 0 <= entl <= math.log(max(avl, 1)) * 1000 + 1000


def test_embedding_anisotropy_matches_python_replica(spark):
    """Exact replica from the collected vectors: identical index-order
    norm fold, e4 floors, bignum S_j/D sums, the ‖Σu‖² − Σ‖u‖² pair
    identity and truncating DIVs (Python // floors — use the trunc
    helper).  Also proves the identity against the O(n²) brute-force
    pairwise dot sum on a 50-vector slice, and locks the
    normalization check mean_self_e6 ≈ 1e6."""
    import math

    from rxtls_spark.queries_training import (
        ANISO_DIM,
        q_embedding_anisotropy,
    )
    from tests.conftest import SF_SMOKE

    def tdiv(a: int, b: int) -> int:
        q = abs(a) // abs(b)
        return q if (a >= 0) == (b >= 0) else -q

    rows = (
        spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
        .select("embedding")
        .collect()
    )
    qs = []
    for r in rows:
        x = [float(v) for v in r["embedding"]]
        n2 = x[0] * x[0]
        for j in range(1, ANISO_DIM):
            n2 = n2 + x[j] * x[j]
        nrm = math.sqrt(n2)
        if nrm > 0:
            qs.append(
                [
                    math.floor(x[j] / nrm * 10000.0 + 0.5)
                    for j in range(ANISO_DIM)
                ]
            )
    n = len(qs)
    S = [sum(q[j] for q in qs) for j in range(ANISO_DIM)]
    D = sum(sum(c * c for c in q) for q in qs)
    P = sum(s * s for s in S)
    want_cos = tdiv(P - D, n * (n - 1) * 100)
    want_self = tdiv(D, n * 100)

    got = q_embedding_anisotropy(spark, SF_SMOKE).collect()
    assert len(got) == 1
    assert got[0]["n_vecs"] == n
    assert got[0]["mean_cos_e6"] == want_cos
    assert got[0]["mean_self_e6"] == want_self
    assert abs(want_self - 1000000) <= 10
    assert abs(want_cos) < 1000000

    sl = qs[:50]
    brute = sum(
        sum(a * b for a, b in zip(sl[i], sl[j]))
        for i in range(50)
        for j in range(50)
        if i != j
    )
    ps = [sum(q[j] for q in sl) for j in range(ANISO_DIM)]
    assert brute == sum(s * s for s in ps) - sum(
        sum(c * c for c in q) for q in sl
    )


def test_pl2_topk_matches_python_replica(spark):
    """PL2 recomputed in Python floats with the exact `_pl2_term`
    operation order (tfn/λ rationals, log2/ln, per-term e3 floor then
    exact sum) over the collected texts — full top-k row equality
    including ranks.  Also locks the DFR sanity: a doc with zero
    query-term hits scores 0, and the top-1 doc has at least one
    query term."""
    import math
    import re
    from collections import Counter

    from rxtls_spark.queries_training import (
        BM25_N_TERMS,
        BM25_TOPK,
        q_pl2_topk,
    )
    from tests.conftest import SF_SMOKE

    texts = {
        r["doc_id"]: re.split(
            "[ \t\n\x0B\f\r]+", r["text"].strip().lower()
        )
        for r in spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .select("doc_id", "text")
        .collect()
        if r["text"].strip()
    }
    cnt = Counter(t for ts in texts.values() for t in ts)
    terms = sorted(cnt, key=lambda t: (-cnt[t], t))[:BM25_N_TERMS]
    n_docs = len(texts)
    total = sum(len(ts) for ts in texts.values())

    def pl2(ts):
        dl = len(ts)
        s = 0
        for t in terms:
            tf = sum(1 for x in ts if x == t)
            if tf <= 0:
                continue
            tfn = float(tf) * math.log2(
                1.0 + float(total) / (float(n_docs) * float(dl))
            )
            lam = float(cnt[t]) / float(n_docs)
            s += math.floor(
                (
                    tfn * math.log2(tfn / lam)
                    + (lam - tfn) / math.log(2.0)
                    + 0.5 * math.log2(2.0 * math.pi * tfn)
                )
                / (tfn + 1.0)
                * 1000.0
            )
        return s

    want = {d: (len(ts), pl2(ts)) for d, ts in texts.items()}
    order = sorted(want, key=lambda d: (-want[d][1], d))[:BM25_TOPK]

    got = q_pl2_topk(spark, SF_SMOKE).collect()
    assert [r["doc_id"] for r in sorted(got, key=lambda r: r["rank"])] == order
    for r in got:
        dl, sc = want[r["doc_id"]]
        assert (r["n_tokens"], r["pl2_e3"]) == (dl, sc)
    top1 = order[0]
    assert any(t in texts[top1] for t in terms)
    no_hit = [d for d, ts in texts.items() if not any(t in ts for t in terms)]
    for d in no_hit:
        assert want[d][1] == 0


def test_rouge_pairs_matches_python_dp(spark):
    """The nested-fold LCS proven against a textbook O(nm) Python DP
    on every pair, exact ratio equality, plus the semantic locks:
    `same` scores f == 1e6 exactly; `append` has lcs == len_a (a is a
    prefix-subsequence of b) with p < 1e6 when b gained tokens inside
    the cap; ROUGE-L never exceeds 1e6; and the BLEU-vs-ROUGE split
    is real somewhere (a variant where order-free overlap and LCS
    disagree would need a shuffle variant — here we lock lcs <=
    min(len_a, len_b) instead)."""
    import re

    from rxtls_spark.queries_training import ROUGE_MAX_TOK, q_rouge_pairs
    from tests.conftest import SF_SMOKE

    ws = "[ \t\n\x0B\f\r]+"
    texts = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .select("doc_id", "text")
        .collect()
        if r["doc_id"] % 20 == 0 and r["text"].strip()
    }

    def toks(s):
        return re.split(ws, s.strip())[:ROUGE_MAX_TOK]

    def lcs(a, b):
        old = [0] * (len(b) + 1)
        for x in a:
            nr = [0]
            for j, y in enumerate(b, 1):
                nr.append(max(old[j], nr[-1], old[j - 1] + (x == y)))
            old = nr
        return old[len(b)]

    want = {}
    for d, a in texts.items():
        for v, b in (
            ("same", a),
            ("append", a + " extra!"),
            ("sub", a.replace("a", "b")),
            ("half", a[: len(a) // 2]),
        ):
            ta, tb = toks(a), toks(b)
            want[(d, v)] = (len(ta), len(tb), lcs(ta, tb))

    got = q_rouge_pairs(spark, SF_SMOKE).collect()
    assert len(got) == len(want)
    for r in got:
        la, lb, l = want[(r["doc_id"], r["variant"])]
        assert (r["len_a"], r["len_b"], r["lcs"]) == (la, lb, l)
        assert r["rouge_r_e6"] == l * 10**6 // la
        assert r["rouge_p_e6"] == l * 10**6 // lb
        assert r["rouge_f_e6"] == 2 * l * 10**6 // (la + lb)
        assert l <= min(la, lb)
        assert r["rouge_f_e6"] <= 10**6
        if r["variant"] == "same":
            assert r["rouge_f_e6"] == 10**6
        if r["variant"] == "append":
            assert l == la


def test_moore_lewis_matches_python_replica(spark):
    """Exact-integer replica from collected (doc, is_en, bucket)
    rows: the identical Laplace e3-ln floors for both LMs, the
    signed per-doc Σ c·Δlp, fixed-k (score DESC, doc_id) — full
    row equality including ranks.  Semantic lock: the top slice is
    dominated by in-domain docs (>= 80%) AND in-domain mean score
    exceeds out-of-domain mean (the likelihood-ratio point)."""
    import math

    from pyspark.sql import functions as F

    from rxtls_spark.queries_training import (
        MOLE_K,
        _docs,
        _hex_digit_map,
        _lm_tokens,
        _token_bucket,
        lang_guess,
        q_moore_lewis,
    )
    from tests.conftest import SF_SMOKE

    hexmap = _hex_digit_map()
    rows = (
        _docs(spark, SF_SMOKE)
        .where(F.trim("text") != "")
        .select(
            "doc_id",
            F.when(lang_guess() == "en", 1).otherwise(0).alias("is_en"),
            F.explode(_lm_tokens()).alias("tok"),
        )
        .select(
            "doc_id",
            "is_en",
            _token_bucket(F.col("tok"), hexmap).alias("bucket"),
        )
        .collect()
    )
    per_doc: dict = {}
    en_of: dict = {}
    cg = [0] * 64
    ci = [0] * 64
    for r in rows:
        per_doc.setdefault(r["doc_id"], {}).setdefault(r["bucket"], 0)
        per_doc[r["doc_id"]][r["bucket"]] += 1
        en_of[r["doc_id"]] = r["is_en"]
        cg[r["bucket"]] += 1
        if r["is_en"]:
            ci[r["bucket"]] += 1
    ng, ni = sum(cg), sum(ci)
    diff = [
        math.floor(math.log((ci[b] + 1) / (ni + 64.0)) * 1000.0)
        - math.floor(math.log((cg[b] + 1) / (ng + 64.0)) * 1000.0)
        for b in range(64)
    ]
    want = {
        d: (
            en_of[d],
            sum(h.values()),
            sum(c * diff[b] for b, c in h.items()),
        )
        for d, h in per_doc.items()
    }
    order = sorted(want, key=lambda d: (-want[d][2], d))[:MOLE_K]

    got = q_moore_lewis(spark, SF_SMOKE).collect()
    assert [r["doc_id"] for r in sorted(got, key=lambda r: r["rank"])] == order
    for r in got:
        en, nt, sc = want[r["doc_id"]]
        assert (r["is_en"], r["n_toks"], r["ce_diff_e3"]) == (en, nt, sc)
    kept_en = sum(r["is_en"] for r in got)
    assert kept_en >= 0.8 * len(got)
    en_scores = [v[2] for v in want.values() if v[0] == 1]
    non_scores = [v[2] for v in want.values() if v[0] == 0]
    assert en_scores and non_scores
    assert sum(en_scores) / len(en_scores) > sum(non_scores) / len(non_scores)


def test_hll_intersect_matches_python_replica(spark):
    """Full sketch replica in exact Python ints + IEEE doubles: md5
    keys, rho registers with the M=0 densified convention, greatest-
    merge, the identical estimate expression, inclusion-exclusion on
    the e3 floors, and the exact shared-type audit — row equality.
    Locks the sketch-algebra semantics: union est >= each side's est
    (registers only grow under max-merge), and the intersection
    estimate tracks the exact count within the m=64 error band
    (median relative error < 25%)."""
    import hashlib
    import math
    import re

    from rxtls_spark.queries_training import (
        HLL_M,
        HLL_REM_BITS,
        q_hll_intersect,
    )
    from tests.conftest import SF_SMOKE

    per_src_types: dict = {}
    for r in (
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .select("source", "text")
        .collect()
    ):
        if not r["text"].strip():
            continue
        t = re.split("[ \t\n\x0B\f\r]+", r["text"].strip().lower())
        gs = {f"{a} {b}" for a, b in zip(t, t[1:])}
        per_src_types.setdefault(r["source"], set()).update(gs)
    # NOTE: exact audit is on distinct (source, g) — union of doc sets

    def regs_of(types):
        regs = [0] * HLL_M
        for g in types:
            x = int(hashlib.md5(g.encode()).hexdigest()[:13], 16)
            b, rem = x % HLL_M, x // HLL_M
            rho = HLL_REM_BITS + 1  # zero remainder convention
            for k in range(1, HLL_REM_BITS + 1):
                if rem >= 1 << (HLL_REM_BITS - k):
                    rho = k
                    break
            regs[b] = max(regs[b], rho)
        return regs

    def est(regs):
        s = sum(1 << (HLL_REM_BITS + 1 - m) for m in regs)
        nu = sum(1 for m in regs if m > 0)
        raw = (
            (0.7213 / (1.0 + 1.079 / float(HLL_M)))
            * float(HLL_M)
            * float(HLL_M)
            * float(1 << (HLL_REM_BITS + 1))
            / float(s)
        )
        if HLL_M - nu > 0 and raw <= 2.5 * HLL_M:
            v = HLL_M * math.log(HLL_M / float(HLL_M - nu))
        else:
            v = raw
        return math.floor(v * 1000)

    regs = {s: regs_of(t) for s, t in per_src_types.items()}
    srcs = sorted(regs)
    got = {
        (r["source_a"], r["source_b"]): r
        for r in q_hll_intersect(spark, SF_SMOKE).collect()
    }
    assert len(got) == len(srcs) * (len(srcs) - 1) // 2
    rel_errs = []
    for i, sa in enumerate(srcs):
        for sb in srcs[i + 1 :]:
            ea, eb = est(regs[sa]), est(regs[sb])
            eu = est([max(x, y) for x, y in zip(regs[sa], regs[sb])])
            exact = len(per_src_types[sa] & per_src_types[sb])
            r = got[(sa, sb)]
            assert (r["est_a_e3"], r["est_b_e3"], r["est_union_e3"]) == (
                ea,
                eb,
                eu,
            )
            assert r["est_inter_e3"] == ea + eb - eu
            assert r["n_exact_inter"] == exact
            assert eu >= max(ea, eb)
            if exact:
                rel_errs.append(abs(r["est_inter_e3"] / 1000 - exact) / exact)
    rel_errs.sort()
    assert rel_errs[len(rel_errs) // 2] < 0.25

def test_borda_fusion_matches_python_replica(spark):
    """Borda points recomputed from the three collected ranked lists:
    fixed-k row equality, the points bound borda <= 3·TOPK, the
    consensus lock (some doc appears in >= 2 lists — fusion is doing
    something), and the social-choice sanity that a doc carried by
    all three lists outranks any single-list doc with the same or
    fewer points."""
    from rxtls_spark.queries_training import (
        BM25_TOPK,
        q_bm25_topk,
        q_borda_fusion,
        q_pl2_topk,
        q_qlm_topk,
    )
    from tests.conftest import SF_SMOKE

    pts: dict = {}
    nls: dict = {}
    for q in (q_bm25_topk, q_qlm_topk, q_pl2_topk):
        for r in q(spark, SF_SMOKE).collect():
            pts[r["doc_id"]] = pts.get(r["doc_id"], 0) + (
                BM25_TOPK + 1 - r["rank"]
            )
            nls[r["doc_id"]] = nls.get(r["doc_id"], 0) + 1
    order = sorted(pts, key=lambda d: (-pts[d], d))[:BM25_TOPK]

    got = q_borda_fusion(spark, SF_SMOKE).collect()
    assert [r["doc_id"] for r in sorted(got, key=lambda r: r["rank"])] == order
    for r in got:
        assert (r["borda"], r["n_lists"]) == (pts[r["doc_id"]], nls[r["doc_id"]])
        assert 1 <= r["borda"] <= 3 * BM25_TOPK
    assert any(r["n_lists"] >= 2 for r in got)


def test_auc_bootstrap_matches_python_replica(spark):
    """Per-replicate AUC recomputed with exact Python ints from the
    engine features: md5-permille Poisson weights, the weighted
    Mann-Whitney doubled-U on the e3-score histogram — full row
    equality including ranks.  Statistical locks: every replicate
    AUC in (500000, 1e6) (the classifier genuinely separates), the
    replicate spread is non-degenerate (min < max), and the
    unweighted point AUC lies INSIDE [min, max] of the replicates
    (the CI actually brackets the estimate on this data)."""
    import hashlib
    import math

    from rxtls_spark.queries_training import (
        AUCB_B,
        _logreg_train,
        _poisson_weight_table,
        logreg_features,
        q_auc_bootstrap,
    )
    from tests.conftest import SF_SMOKE

    fx = logreg_features(spark.read.parquet(f"{SF_SMOKE}/documents.parquet"))
    feats = {
        r["doc_id"]: (r["x1"], r["x2"], r["x3"], int(r["y"]))
        for r in fx.collect()
    }
    _, wv = _logreg_train(fx)
    tab = _poisson_weight_table()
    sc = {}
    for d, (x1, x2, x3, y) in feats.items():
        m = wv[0] * 1.0 + wv[1] * x1 + wv[2] * x2 + wv[3] * x3
        sc[d] = (math.floor(1.0 / (1.0 + math.exp(-m)) * 1000 + 0.5), y)

    def auc_of(weight_fn):
        cells = {}
        for d, (p, y) in sc.items():
            w = weight_fn(d)
            wp, wn = cells.get(p, (0, 0))
            cells[p] = (wp + w * y, wn + w * (1 - y))
        P = sum(wp for wp, _ in cells.values())
        N = sum(wn for _, wn in cells.values())
        cum, auc2 = 0, 0
        for p in sorted(cells, reverse=True):
            wp, wn = cells[p]
            cum += wp
            auc2 += wn * (2 * cum - wp)
        return (auc2 * 10**6 // (2 * P * N), P, N) if P and N else (0, P, N)

    want = {}
    for b in range(1, AUCB_B + 1):

        def wfn(d, b=b):
            h = hashlib.md5(f"ab{b}|{d}".encode()).hexdigest()[:13]
            return tab[int(h, 16) % 1000]

        want[b] = auc_of(wfn)

    got = sorted(q_auc_bootstrap(spark, SF_SMOKE).collect(), key=lambda r: r["b"])
    assert len(got) == AUCB_B
    for r in got:
        auc, P, N = want[r["b"]]
        assert (r["auc_e6"], r["w_pos"], r["w_neg"]) == (auc, P, N)
        assert 500000 < r["auc_e6"] < 10**6
    order = sorted(want, key=lambda b: (want[b][0], b))
    assert [r["b"] for r in sorted(got, key=lambda r: r["rk"])] == order
    aucs = [v[0] for v in want.values()]
    assert min(aucs) < max(aucs)
    point, _, _ = auc_of(lambda d: 1)
    assert min(aucs) <= point <= max(aucs)


def test_scorer_kendall_matches_python_replica(spark):
    """τ-b recomputed pairwise in exact Python over the same knuth
    sample: full row equality, the Kendall identities C + D + ties
    partition all pairs and |τ-b| <= 1, and the trio coherence lock:
    per source, sign(τ-b) == sign(Spearman ρ) wherever BOTH are
    decisively nonzero (|·| > 0.05) — the two rank statistics must
    not tell opposite stories on the same data."""
    import math

    from pyspark.sql import functions as F

    from rxtls_spark.queries_training import (
        AGREE_K,
        _docs,
        knuth_hash,
        q_doc_rarity,
        q_scorer_agreement,
        q_scorer_kendall,
        quality_score,
    )
    from tests.conftest import SF_SMOKE

    rar = {
        r["doc_id"]: r["rarity_e3"]
        for r in q_doc_rarity(spark, SF_SMOKE).collect()
    }
    qnum = F.floor(quality_score() * F.lit(100000.0) + F.lit(0.5)).cast(
        "long"
    )
    rows = (
        _docs(spark, SF_SMOKE)
        .select(
            "source",
            "doc_id",
            qnum.alias("qnum"),
            knuth_hash(F.col("doc_id")).alias("h"),
        )
        .collect()
    )
    per_src: dict = {}
    for r in rows:
        if r["doc_id"] in rar:
            per_src.setdefault(r["source"], []).append(
                (r["h"], r["doc_id"], r["qnum"], rar[r["doc_id"]])
            )
    want = {}
    for src, xs in per_src.items():
        xs.sort(key=lambda t: (t[0], t[1]))
        keep = xs[:AGREE_K]
        C = D = tx = ty = 0
        n = len(keep)
        for i in range(n):
            for j in range(i + 1, n):
                a, b = keep[i], keep[j]
                # pair order by doc_id (da < db) matches the join
                if a[1] > b[1]:
                    a, b = b, a
                sx = (a[2] > b[2]) - (a[2] < b[2])
                sy = (a[3] > b[3]) - (a[3] < b[3])
                if sx == 0:
                    tx += 1
                if sy == 0:
                    ty += 1
                if sx * sy == 1:
                    C += 1
                elif sx * sy == -1:
                    D += 1
        T = n * (n - 1) // 2
        tau = (
            math.floor(
                (C - D) / math.sqrt(float(T - tx) * float(T - ty)) * 1e6
            )
            if T > tx and T > ty
            else 0
        )
        want[src] = (T, C, D, tx, ty, tau)

    got = {r["source"]: r for r in q_scorer_kendall(spark, SF_SMOKE).collect()}
    assert set(got) == set(want)
    for src, (T, C, D, tx, ty, tau) in want.items():
        r = got[src]
        assert (
            r["t_pairs"],
            r["c_pairs"],
            r["d_pairs"],
            r["tx"],
            r["ty"],
            r["tau_b_e6"],
        ) == (T, C, D, tx, ty, tau), src
        assert C + D <= T
        assert abs(tau) <= 10**6
    rho = {
        r["source"]: r["rho_e6"]
        for r in q_scorer_agreement(spark, SF_SMOKE).collect()
    }
    for src in want:
        t, p = want[src][5], rho.get(src, 0)
        if abs(t) > 50000 and abs(p) > 50000:
            assert (t > 0) == (p > 0), (src, t, p)
