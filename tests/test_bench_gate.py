"""Score-normalized bench regression gate.

Round 6's verdict: raw wall-clock moved ±40% round-over-round purely
from host drift, requiring manual forensics (BENCH_NOTES.md). Two
normalization layers make the comparison mechanical:

1. the deterministic single-core CPU score corrects clock-speed drift
   (bench.py emits ``normalized_total``);
2. the residual (memory bandwidth, vCPU contention — measured ~1.1-1.3×
   between same-score VMs) is UNIFORM across queries, so each query's
   normalized ratio is compared against the run's own **median** ratio:
   host drift moves the median, a code regression moves one query away
   from it.

The gate: per-query ratio within 25% of the median (one outlier ≤60%
tolerated on a shared VM), and the median itself under 1.6× — a broad
slowdown that large cannot be host drift at matching CPU score.
"""

import os
import statistics
import time

import pytest

import bench as bench_mod

BENCH_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


@pytest.mark.slow
def test_normalized_per_query_regression_under_25pct(spark):
    from miniodb_spark.queries import get_registry

    # the anchor was measured at local[32]; the CPU score normalizes
    # single-core speed, not core count, so the comparison is only
    # meaningful near the anchor's parallelism
    if spark.sparkContext.defaultParallelism < 16:
        pytest.skip("bench gate needs >=16 cores to compare against the "
                    "local[32] anchor (set SPARK_GRAFT_CPUS=32)")
    host_score = bench_mod._host_cpu_score()
    registry = get_registry()
    spark.range(1000).selectExpr("sum(id)").collect()  # warm session

    passes = []
    for _ in range(3):
        sink = {}
        for name in bench_mod.ANCHOR["queries"]:
            fn = bench_mod.BENCH_OVERRIDES.get(name) or registry[name].fn
            t0 = time.perf_counter()
            fn(spark, BENCH_SF_DIR).collect()
            sink[name] = time.perf_counter() - t0
        passes.append(sink)

    scale = bench_mod.ANCHOR["host_cpu_score_sec"] / host_score
    ratios = {
        name: min(p[name] for p in passes) * scale / anchor_s
        for name, anchor_s in bench_mod.ANCHOR["queries"].items()
    }
    med = statistics.median(ratios.values())
    detail = "\n".join(
        f"{n}: {r:.2f}x of anchor ({r / med:.2f}x of median)"
        for n, r in sorted(ratios.items()))

    # a uniform shift this large at matching CPU score is not host drift
    assert med < 1.6, f"broad normalized slowdown: median {med:.2f}x\n{detail}"

    over = [(n, r / med) for n, r in ratios.items() if r / med > 1.25]
    assert len(over) <= 1, f"per-query regressions vs median: {over}\n{detail}"
    assert all(x <= 1.6 for _, x in over), (
        f"per-query regression too large: {over}\n{detail}")


def test_bench_json_contract():
    """The emitted JSON must carry the normalization fields (driver
    contract: BENCH_r{N}.json is graded against BASELINE.md without
    forensics)."""
    assert bench_mod.ANCHOR["host_cpu_score_sec"] > 0
    assert set(bench_mod.ANCHOR["queries"]) == set(bench_mod.BENCH_QUERIES)
    score = bench_mod._host_cpu_score()
    assert 0.001 < score < 10  # sane on any host this century


def test_host_io_score_probe():
    """r14 verdict #2: the IO twin of the CPU score — fixed-size,
    deterministic, components + total, sane bounds, and it must leave
    no probe file behind."""
    import glob
    import tempfile

    before = set(glob.glob(
        os.path.join(tempfile.gettempdir(), "bench_io_probe_*")))
    io = bench_mod._host_io_score()
    after = set(glob.glob(
        os.path.join(tempfile.gettempdir(), "bench_io_probe_*")))
    assert after == before  # probe cleans up
    assert set(io) == {"seq_32mib_sec", "fsync_50x4k_sec", "total_sec"}
    assert 0.0005 < io["total_sec"] < 60
    assert abs(io["total_sec"] -
               (io["seq_32mib_sec"] + io["fsync_50x4k_sec"])) < 0.01


def test_read_raw_band_definition():
    """r14 verdict #1: the raw-first read band must bracket every
    post-anchor-era historical median (r07-r14 spanned [1.06, 1.65])
    with the +-10% reading tolerance, and the anchor itself (1.0) must
    be in-band — so a same-code run on any historically observed host
    reads as 'in', never as a regression."""
    lo, hi = bench_mod.READ_RAW_BAND
    assert lo <= 1.0 <= hi
    for historical_median in (1.094, 1.062, 1.174, 1.516, 1.652,
                              1.397, 1.202):
        assert lo <= historical_median <= hi, historical_median
