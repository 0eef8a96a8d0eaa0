"""Scaling-efficiency evidence (north rule: N→4N executors ≥ 0.8).

No real cluster exists in this sandbox, so per the driver protocol the
same job runs at two local parallelism levels — local[8] vs local[32]
(N cores → 4N cores) — on the same cached input, and we report
sustained pages/sec at both plus efficiency = (T_hi / T_lo) / 4.

Usage: python tools/bench_scaling.py [lo hi]   (default 8 32)
Writes bench_scaling.json and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)  # rxtls_spark importable in mp workers


def run_bench(cpus: int) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cpus),
        SPARK_GRAFT_BENCH_RUNS=os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2"),
    )
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, timeout=1800, check=True,
    )
    line = out.stdout.strip().splitlines()[-1]
    return json.loads(line)


def machine_ceiling(lo: int, hi: int) -> float:
    """CPU-only scaling ceiling of this box: the same parse kernel in
    raw multiprocessing (no Spark, no I/O).  On a shared VM the host
    steals cycles as more cores engage — Spark cannot beat this number,
    so scaling efficiency is reported both raw and ceiling-normalized."""
    import multiprocessing as mp

    def rate(nproc: int) -> float:
        with mp.Pool(nproc) as p:
            return sum(p.map(_mp_worker, range(nproc)))

    return (rate(hi) / rate(lo)) / (hi / lo)


def _mp_worker(_i: int) -> float:
    import time

    from rxtls_spark import reference, spec

    bufs = [spec.html_bytes(i, "lorem ipsum dolor sit " * 15) for i in range(500)]
    t0 = time.perf_counter()
    cnt = 0
    while time.perf_counter() - t0 < 4:
        for b in bufs:
            reference.parse_html(b)
        cnt += len(bufs)
    return cnt / (time.perf_counter() - t0)


def main() -> None:
    lo = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    hi = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    r_lo = run_bench(lo)
    r_hi = run_bench(hi)
    factor = hi / lo
    # per-query efficiency: (T_lo / T_hi) / factor
    per_query = {
        name: round((r_lo["queries"][name] / r_hi["queries"][name]) / factor, 3)
        for name in r_lo["queries"]
        if name in r_hi["queries"]
    }
    # headline = the full-fidelity parse→enrich→route pipeline (the
    # 100 TB job's shape).  The lite aggregate path is so cheap that at
    # this input size it is overhead-bound, not compute-bound — its
    # efficiency measures job-fixed costs, not the engine.
    headline = "parse_route_agg_full"
    eff = per_query[headline]
    n_pages = r_hi["pages"]
    ceiling = machine_ceiling(lo, hi)
    result = {
        "metric": "scaling_efficiency",
        "lo_cpus": lo,
        "hi_cpus": hi,
        "headline_query": headline,
        "lo_pages_per_sec": round(n_pages / r_lo["queries"][headline], 1),
        "hi_pages_per_sec": round(n_pages / r_hi["queries"][headline], 1),
        "scale_factor": factor,
        "efficiency": eff,
        "efficiency_per_query": per_query,
        "machine_ceiling_efficiency": round(ceiling, 3),
        "efficiency_vs_machine": round(eff / ceiling, 3),
        "pass_0.8": eff >= 0.8,
        "pass_0.8_vs_machine": eff / ceiling >= 0.8,
        "lo_queries": r_lo["queries"],
        "hi_queries": r_hi["queries"],
    }
    with open(os.path.join(REPO, "bench_scaling.json"), "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
