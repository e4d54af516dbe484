"""bench.py contract tests (r9 review pass — the timing protocol had
never had a dedicated pass; round 2 lost its entire bench signal to a
crash, so the one-JSON-line contract is driver-critical).

Runs bench.py as a SUBPROCESS (the driver's invocation shape) at
sf0.001 scoped to a 2-query subset via SPARK_GRAFT_BENCH_QUERIES (a
test-only hook the driver never sets) and asserts the contract:
exactly one JSON line on stdout with metric/value/unit/queries/sf,
headline `value` present, per-query timings positive. The typo'd
subset exits 2 loudly instead of silently timing nothing.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import threading
import warnings

import pytest


def _slow_enabled() -> bool:
    return os.environ.get("SPARK_GRAFT_SLOW", "").strip().lower() in (
        "1",
        "true",
        "yes",
        "on",
    )

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH = os.path.join(REPO, "bench.py")


def _run(extra_env: dict, timeout: int = 420):
    env = os.environ.copy() | {
        "SPARK_GRAFT_SF_DIR": "/root/testdata/sf0.001",
        "SPARK_GRAFT_CPUS": "4",
    } | extra_env
    return subprocess.run(
        [sys.executable, BENCH],
        capture_output=True,
        text=True,
        env=env,
        timeout=timeout,
        cwd="/tmp",  # foreign cwd, like every driver-contract check
    )


def test_bench_one_json_line_contract():
    r = _run(
        {"SPARK_GRAFT_BENCH_QUERIES": "a4_pricing_summary,p1_conform_project"}
    )
    assert r.returncode == 0, r.stderr[-2000:]
    lines = [ln for ln in r.stdout.strip().splitlines() if ln.strip()]
    assert len(lines) == 1, r.stdout
    payload = json.loads(lines[0])
    for key in ("metric", "value", "unit", "queries", "sf"):
        assert key in payload, payload
    assert payload["metric"] == "headline_query_time"
    assert payload["unit"] == "sec"
    assert payload["sf"] == 0.001
    assert set(payload["queries"]) == {
        "a4_pricing_summary", "p1_conform_project"
    }
    assert all(v > 0 for v in payload["queries"].values())
    # the one subset member that IS a headline query contributes to
    # value; no headline member errored, so value is a number
    assert payload["value"] is not None and payload["value"] > 0
    assert "errors" not in payload
    assert payload["total_all_queries"] >= payload["value"]
    # box telemetry (r10, r9 VERDICT #1): the artifact must carry
    # enough load/CPU context to adjudicate a contended run on its
    # face — loadavg snapshots bracketing the timed loop, cpu count,
    # and the fixed calibration-loop timings.
    box = payload["box"]
    assert box["cpus"] and box["cpus"] > 0
    for key in ("loadavg_before", "loadavg_after"):
        la = box[key]
        assert la is not None and len(la) == 3
        assert all(isinstance(x, float) and x >= 0 for x in la)
    for key in ("calib_ms_before", "calib_ms_after"):
        assert box[key] > 0
    # r10 VERDICT #3: the idle reference band rides in the artifact
    # itself, so a future judge adjudicates contention without prose
    lo, hi = box["calib_ms_idle_ref"]
    assert 0 < lo < hi
    # r13 (r12 VERDICT #1): the parallel companion calibration and
    # its own band must ride along — the single-thread loop provably
    # reads idle under multi-core starvation
    for key in ("pcalib_ms_before", "pcalib_ms_after"):
        assert box[key] is None or box[key] > 0
    plo, phi = box["pcalib_ms_idle_ref"]
    assert 0 < plo < phi


def test_calib_idle_ref_band_matches_baseline_md():
    """The idle calibration band is recorded in THREE places that
    must agree: bench.py's CALIB_MS_IDLE_REF constant (the source of
    truth, emitted into every BENCH artifact), BASELINE.md's
    driver-target table (where the judge reads targets), and this
    pin — all unconditional.

    The LIVE measurement is only a pure sanity bound (r11 ADVICE +
    VERDICT watch item #1): the old `lo/2 <= m <= hi*20` flaked in
    BOTH directions — hardware >=2x faster than the recorded box
    undercuts lo/2 with correct code, and a CI box running the suite
    32-way-parallel can inflate past hi*20. Band-vs-hardware drift is
    a warning, never a failure; contention adjudication belongs to
    the ARTIFACT (bench emits calib_ms + loadavg into every JSON),
    not to this suite's wall clock."""
    sys.path.insert(0, REPO)
    import bench

    lo, hi = bench.CALIB_MS_IDLE_REF
    assert 0 < lo < hi
    assert hi - lo >= 2.0 and hi / lo < 2.0
    text = open(os.path.join(REPO, "BASELINE.md")).read()
    assert f"[{lo}, {hi}]" in text, (
        "BASELINE.md's idle-calibration row must quote the same band "
        "bench.py emits"
    )
    assert "CALIB_MS_IDLE_REF" in text
    # r13: the parallel band is pinned the same way
    plo, phi = bench.PCALIB_MS_IDLE_REF
    assert 0 < plo < phi
    assert phi - plo >= 2.0 and phi / plo < 2.0
    assert f"[{plo}, {phi}]" in text, (
        "BASELINE.md's idle PARALLEL-calibration row must quote the "
        "same band bench.py emits"
    )
    assert "PCALIB_MS_IDLE_REF" in text
    m = bench._calib_ms()
    # pure sanity: a real positive measurement from a loop that
    # terminates. 60s is ~2000x the recorded band — unreachable by
    # contention, reachable only by a broken loop.
    assert 0.0 < m < 60_000.0, (m, lo, hi)
    if not (lo / 2.0 <= m <= hi * 20.0):
        warnings.warn(
            f"calib_ms {m} sits far outside the recorded idle band "
            f"[{lo}, {hi}]; if this box is the bench box, re-record "
            "CALIB_MS_IDLE_REF (bench.py + BASELINE.md)"
        )


@pytest.mark.skipif(
    not _slow_enabled(),
    reason="deliberate-load survival soak (~45 s) — SPARK_GRAFT_SLOW=1",
)
def test_calib_sanity_bound_survives_loaded_box(monkeypatch):
    """The suite's only wall-clock-sensitive assert must not flake
    under deliberate load (r11 VERDICT #4 done-criterion: 'test
    passes under a deliberately loaded box'). GIL-contending spinner
    threads are the worst case for a single-thread pure-Python
    calibration loop — under ~48 of them the old hi*20 ceiling is
    routinely exceeded; the sanity bound is not.

    The parallel loop runs with a reduced iteration count here: 48
    GIL-hogging spinners starve 32 md5 threads of their brief GIL
    re-acquisitions, so full-size pcalib under this worst case costs
    ~70 s of pure wall for a survival (not band) assertion — the
    loop's structure under load is what's certified."""
    sys.path.insert(0, REPO)
    import bench

    monkeypatch.setattr(bench, "_PCALIB_ITERS", 4)

    stop = threading.Event()

    def spin():
        while not stop.is_set():
            x = 0
            for i in range(10_000):
                x += i

    threads = [
        threading.Thread(target=spin, daemon=True) for _ in range(48)
    ]
    for t in threads:
        t.start()
    try:
        m = bench._calib_ms()
        pm = bench._pcalib_ms()
    finally:
        stop.set()
        for t in threads:
            t.join(timeout=10)
    assert 0.0 < m < 60_000.0, m
    # the parallel loop must also survive load with a sane value
    # (band adjudication stays with the artifact, not this suite)
    assert pm is None or 0.0 < pm < 600_000.0, pm


def test_bench_calibration_loop_is_stable():
    """The calibration loop must be a usable noise floor: two
    back-to-back min-of-3 runs in the same (current) process agree
    within 3x — a bound loose enough for any box state, tight enough
    to catch a broken loop (e.g. one returning ~0ms)."""
    sys.path.insert(0, REPO)
    import bench

    a, b = bench._calib_ms(), bench._calib_ms()
    assert a > 1 and b > 1  # a real loop, not optimized away
    assert max(a, b) / min(a, b) < 3.0

    pa, pb = bench._pcalib_ms(), bench._pcalib_ms()
    assert pa > 1 and pb > 1
    assert max(pa, pb) / min(pa, pb) < 3.0

    la = bench._loadavg()
    assert la is not None and len(la) == 3


def test_bench_unknown_subset_exits_loudly():
    r = _run({"SPARK_GRAFT_BENCH_QUERIES": "a4_pricing_summary,zz_typo"}, timeout=120)
    assert r.returncode == 2
    assert "zz_typo" in r.stderr


def test_scaling_report_writer_preserves_attribution(tmp_path):
    """r9 review finding: tools/scaling_report.py regenerates
    SCALING.md with a plain overwrite, which would have destroyed the
    committed '## Attribution notes' analysis on the next regen —
    write_report must carry every hand-written section from that
    heading onward across rewrites."""
    sys.path.insert(0, os.path.join(REPO, "tools"))
    from scaling_report import write_report

    out = str(tmp_path / "SCALING.md")
    with open(out, "w") as f:
        f.write(
            "# SCALING old\n\n| q | t |\n|---|---|\n| a | 1s |\n\n"
            "## Attribution notes\n\n- hand-written analysis, keep me\n"
        )
    write_report(["# SCALING new", "", "| q | t |", "| b | 2s |"], out)
    got = open(out).read()
    assert "# SCALING new" in got and "| b | 2s |" in got
    assert "old" not in got and "| a | 1s |" not in got
    assert "## Attribution notes" in got
    assert "hand-written analysis, keep me" in got
    # idempotent: a second regen keeps exactly one attribution section
    write_report(["# SCALING newer"], out)
    got2 = open(out).read()
    assert got2.count("## Attribution notes") == 1
    assert "hand-written analysis, keep me" in got2
    # and a fresh file (no prior report) writes cleanly
    out2 = str(tmp_path / "fresh.md")
    write_report(["# SCALING fresh"], out2)
    assert open(out2).read().startswith("# SCALING fresh")
