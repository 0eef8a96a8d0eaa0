"""spark-submit job entry points, smoked as real subprocesses (their
own sessions — cannot share the suite's, see test_retry.py note)."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args, timeout=420):
    env = dict(os.environ, PYTHONPATH=REPO)
    return subprocess.run(
        [sys.executable] + args,
        capture_output=True,
        text=True,
        timeout=timeout,
        env=env,
        cwd=REPO,
    )


def test_run_dedup_job(tmp_path):
    out = _run([
        "jobs/run_dedup.py",
        "--docs", "/root/testdata/sf0.001",
        "--output", str(tmp_path / "run"),
        "--master", "local[4]",
    ])
    assert out.returncode == 0, out.stderr[-2000:]
    summary = json.loads(out.stdout.strip().splitlines()[-1])
    assert summary["n_kept"] + summary["n_dropped"] == summary["n_docs"]
    assert summary["n_dropped"] > 0  # organic near-dups exist at sf0.001
    assert os.path.exists(tmp_path / "run" / "kept" / "_SUCCESS")
    disk = json.load(open(tmp_path / "run" / "summary.json"))
    assert disk == summary


def test_run_pipeline_job_resumes(tmp_path):
    """Crash after 1 of 2 buckets → rerun completes; exit codes honor
    the manifest contract."""
    base = [
        "jobs/run_pipeline.py",
        "--pages", "/root/testdata/sf0.001",
        "--output", str(tmp_path / "run"),
        "--buckets", "2",
        "--master", "local[4]",
    ]
    first = _run(base + ["--fail-after", "1"])
    assert first.returncode == 1, first.stderr[-2000:]
    second = _run(base)
    assert second.returncode == 0, second.stderr[-2000:]
    summary = json.loads(second.stdout.strip().splitlines()[-1])
    assert summary["complete"] and summary["buckets_committed"] == 2


def test_run_corpus_build_job(tmp_path):
    out = _run([
        "jobs/run_corpus_build.py",
        "--docs", "/root/testdata/sf0.001",
        "--output", str(tmp_path / "run"),
        "--master", "local[4]",
    ])
    assert out.returncode == 0, out.stderr[-2000:]
    summary = json.loads(out.stdout.strip().splitlines()[-1])
    # monotone survivor funnel, nothing silently dropped or invented
    assert (
        summary["n_sampled"]
        <= summary["n_after_gates"]
        <= summary["n_after_dedup"]
        <= summary["n_docs"]
    )
    assert summary["n_docs"] == 500
    assert summary["n_sampled"] > 0
    assert sum(summary["per_lang"].values()) == summary["n_sampled"]
    assert summary["n_seqs"] >= summary["n_tokens"] // summary["seq_len"]
    assert os.path.exists(tmp_path / "run" / "summary.json")
    # corpus written partitioned by lang, PII-scrubbed text on disk
    langs = [
        d for d in os.listdir(tmp_path / "run" / "corpus")
        if d.startswith("lang=")
    ]
    assert len(langs) == len(summary["per_lang"])


def test_run_corpus_build_job_dsir_sampling(tmp_path):
    """--sample-mode dsir: importance selection keeps exactly the top
    --dsir-frac of gated docs by target-domain weight, and the kept
    set skews toward the target language."""
    out = _run([
        "jobs/run_corpus_build.py",
        "--docs", "/root/testdata/sf0.001",
        "--output", str(tmp_path / "run"),
        "--sample-mode", "dsir",
        "--dsir-target", "en",
        "--dsir-frac", "0.4",
        "--master", "local[4]",
    ])
    assert out.returncode == 0, out.stderr[-2000:]
    summary = json.loads(out.stdout.strip().splitlines()[-1])
    assert summary["sample_mode"] == "dsir"
    assert summary["dsir_target"] == "en"
    # exact top-frac of SCOREABLE docs (empty-text gated docs are
    # unscoreable — counted in the summary, not silently dropped)
    n_scoreable = summary["n_after_gates"] - summary["n_dsir_unscoreable"]
    assert summary["n_sampled"] == max(1, int(n_scoreable * 0.4))
    # importance selection toward 'en' over-represents it: largest
    # language in the sample, and well above a uniform share
    per_lang = summary["per_lang"]
    assert max(per_lang, key=per_lang.get) == "en", per_lang
    en_frac = per_lang.get("en", 0) / summary["n_sampled"]
    assert en_frac > 1.5 / len(per_lang), per_lang


def test_run_corpus_build_job_quantile_gate(tmp_path):
    """--quality-mode quantile: the per-lang histogram gate (the
    100-TB shape) replaces the fixed threshold; the funnel stays
    monotone and every language keeps roughly its top third."""
    out = _run([
        "jobs/run_corpus_build.py",
        "--docs", "/root/testdata/sf0.001",
        "--output", str(tmp_path / "run"),
        "--quality-mode", "quantile",
        "--max-dup3", "1.0",  # isolate the quality gate
        "--master", "local[4]",
    ])
    assert out.returncode == 0, out.stderr[-2000:]
    summary = json.loads(out.stdout.strip().splitlines()[-1])
    assert summary["quality_mode"] == "quantile"
    assert (
        summary["n_sampled"]
        <= summary["n_after_gates"]
        <= summary["n_after_dedup"]
        <= summary["n_docs"]
    )
    # adaptive per-lang thresholds recorded, one per language present
    thr = summary["quality_thresholds"]
    assert thr and all(isinstance(v, int) for v in thr.values())
    # top-third cut: kept fraction is ~1/3 of the deduped corpus
    # (boundary-bucket ties only ADD survivors, never remove)
    frac = summary["n_after_gates"] / summary["n_after_dedup"]
    assert 1 / 3 - 0.01 <= frac <= 0.45, frac


def test_run_corpus_build_job_cascade_gate(tmp_path):
    """--gate-mode cascade: the filter_cascade funnel replaces the
    threshold gates; per-verdict counts partition the deduped corpus
    exactly, kept == n_after_gates, and the funnel verdicts match an
    in-process q_filter_cascade recount on the same corpus."""
    out = _run([
        "jobs/run_corpus_build.py",
        "--docs", "/root/testdata/sf0.001",
        "--output", str(tmp_path / "run"),
        "--gate-mode", "cascade",
        "--master", "local[4]",
    ])
    assert out.returncode == 0, out.stderr[-2000:]
    summary = json.loads(out.stdout.strip().splitlines()[-1])
    assert summary["gate_mode"] == "cascade"
    funnel = summary["funnel"]
    assert funnel and sum(funnel.values()) == summary["n_after_dedup"]
    assert funnel.get("kept", 0) == summary["n_after_gates"]
    assert summary["n_sampled"] <= summary["n_after_gates"]
    from rxtls_spark.queries_training import _CASCADE_GATES

    assert set(funnel) <= set(_CASCADE_GATES) | {"kept"}


def test_run_corpus_build_job_soft_dedup(tmp_path):
    """--dedup-mode soft keeps EVERY doc and attaches the SoftDeDup
    1/dup_count weight: on a corpus where every text appears exactly
    twice, nothing is dropped, every weight is 500000, and the written
    corpus carries the weight column."""
    import pyarrow.parquet as pq
    import pyarrow as pa

    src = pq.read_table("/root/testdata/sf0.001/documents.parquet")
    ids = src.column("doc_id").to_pylist()
    copy = src.set_column(
        src.schema.get_field_index("doc_id"),
        "doc_id",
        pa.array([i + 10_000_000 for i in ids], type=pa.int64()),
    )
    docs_path = tmp_path / "docs.parquet"
    pq.write_table(pa.concat_tables([src, copy]), docs_path)

    out = _run([
        "jobs/run_corpus_build.py",
        "--docs", str(docs_path),
        "--output", str(tmp_path / "run"),
        "--dedup-mode", "soft",
        "--quality", "-1", "--max-dup3", "1.0",  # neutralize gates
        "--master", "local[4]",
    ])
    assert out.returncode == 0, out.stderr[-2000:]
    summary = json.loads(out.stdout.strip().splitlines()[-1])
    assert summary["dedup_mode"] == "soft"
    # soft mode never drops: dedup stage is a weight attach
    assert summary["n_after_dedup"] == summary["n_docs"]
    assert summary["n_soft_weighted"] == summary["n_docs"]  # all dup'd
    # every doc weighs exactly half
    assert summary["eff_docs_e6"] == summary["n_sampled"] * 500_000
    corpus = pq.read_table(str(tmp_path / "run" / "corpus"))
    assert set(corpus.column("weight_e6").to_pylist()) == {500_000}
    assert corpus.num_rows == summary["n_sampled"]


def test_run_corpus_build_job_outlier_screen(tmp_path):
    """--outlier-screen: the robust per-lang median/MAD gate drops the
    quality outliers AFTER the main gates; summary records per-lang
    med2/mad4 and the dropped count; the funnel stays monotone; and
    the dropped set is exactly the |z| >= 3.5-MAD set recomputed from
    a no-screen run's survivors."""
    base = [
        "jobs/run_corpus_build.py",
        "--docs", "/root/testdata/sf0.001",
        "--output", str(tmp_path / "a"),
        "--quality", "0.0",  # isolate the screen (gates pass all)
        "--max-dup3", "1.0",
        "--master", "local[4]",
    ]
    plain = _run(base)
    assert plain.returncode == 0, plain.stderr[-2000:]
    s0 = json.loads(plain.stdout.strip().splitlines()[-1])
    assert s0["n_outlier_dropped"] is None

    screened = _run(
        [a if a != str(tmp_path / "a") else str(tmp_path / "b")
         for a in base]
        + ["--outlier-screen"]
    )
    assert screened.returncode == 0, screened.stderr[-2000:]
    s1 = json.loads(screened.stdout.strip().splitlines()[-1])
    assert s1["outlier_screen"] is True
    assert s1["n_outlier_dropped"] is not None
    assert (
        s1["n_after_gates"] + s1["n_outlier_dropped"]
        == s0["n_after_gates"]
    )
    assert (
        s1["n_sampled"]
        <= s1["n_after_gates"]
        <= s1["n_after_dedup"]
        <= s1["n_docs"]
    )
    stats = s1["outlier_stats"]
    assert stats and all(
        v["mad4_e5"] >= 0 and v["med2_e5"] > 0 for v in stats.values()
    )
    # med2 is a doubled e5 quality (quality in [0,1] → med2 in [0,2e5])
    assert all(v["med2_e5"] <= 200000 for v in stats.values())
