"""bench.py failure-hardening tests (VERDICT r2 weak #2): a transient
backend outage or a crash in the rmat20 scale section must never zero
the whole round's record — the driver's BENCH_r*.json needs one
parsable JSON line with whatever WAS measured.

Runs bench.py as a subprocess (its own backend init path) on tiny
graphs via the GAB_BENCH_* test hooks."""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH = os.path.join(REPO, "bench.py")


def _run_bench(env_extra: dict, timeout=600):
    env = dict(os.environ)
    env.update({
        "GAB_BENCH_PLATFORM": "cpu",
        "GAB_BENCH_SCALE": "10",
        "GAB_BENCH_SCALE20": "11",
        "GAB_BENCH_RETRIES": "2",
        "GAB_BENCH_BACKOFF_S": "0.1",
        **env_extra,
    })
    p = subprocess.run([sys.executable, BENCH], capture_output=True,
                       text=True, env=env, timeout=timeout, cwd=REPO)
    # the LAST stdout line must always be the one JSON record
    lines = [ln for ln in p.stdout.strip().splitlines() if ln.strip()]
    assert lines, f"no stdout; stderr tail: {p.stderr[-800:]}"
    return json.loads(lines[-1]), p


def test_section_fault_preserves_earlier_numbers():
    """A forced crash in a scale section must not erase the rmat17
    record already computed (round-2 postmortem)."""
    rec, _ = _run_bench({"GAB_BENCH_FAULT": "rmat20_gat_epoch"})
    assert rec["metric"] == "spmm_edges_per_s"
    assert rec["value"] is not None and rec["value"] > 0
    assert rec["vs_baseline"] is not None
    assert rec["extra"]["gcn_epoch_s"] > 0
    assert "rmat20_gat_epoch_s" not in rec["extra"]
    assert "injected fault" in rec["errors"]["rmat20_gat_epoch"]


def test_dead_backend_still_emits_record():
    """Backend init fails on every retry -> value null, errors noted,
    but the line is still one parsable JSON record (rc=0)."""
    rec, p = _run_bench({"GAB_BENCH_PLATFORM": "bogus-platform"}, timeout=300)
    assert p.returncode == 0
    assert rec["value"] is None and rec["vs_baseline"] is None
    assert "backend_init" in rec["errors"]
    # two init attempts were made
    assert p.stderr.count("backend init attempt") == 2


def test_record_streams_after_every_section():
    """Round-3 postmortem: the driver killed bench.py mid-run (rc=124)
    and the record — printed only at the very end — was lost. The
    cumulative record must now print after EVERY section, so a timeout
    at any point still leaves a parsed record with everything measured
    so far. The first section's line must already carry the headline."""
    rec, p = _run_bench({})
    lines = [ln for ln in p.stdout.strip().splitlines() if ln.strip()]
    records = [json.loads(ln) for ln in lines]
    # 7 sections + the final emit
    assert len(records) >= 7, p.stdout
    assert records[0]["value"] is not None and records[0]["value"] > 0
    # cumulative: every later record keeps the headline
    assert all(r["value"] == records[0]["value"] for r in records)
    assert rec["extra"]["rmat20_gat_epoch_s"] > 0


def test_budget_guard_skips_sections_and_exits_zero():
    """With an exhausted wall-clock budget every section is skipped,
    the run still exits 0 and prints a parsable (null-value) record
    listing what was skipped — a partial-but-parsed record beats the
    driver's rc=124 with nothing."""
    rec, p = _run_bench({"GAB_BENCH_BUDGET_S": "0"})
    assert p.returncode == 0
    assert rec["value"] is None
    assert "rmat17_spmm" in rec["extra"]["skipped_over_budget"]
    assert "rmat20_gat_epoch" in rec["extra"]["skipped_over_budget"]


def test_rmat20_gcn_fault_isolates_and_explains_gat():
    """A crash while building the rmat20 dataset must not cascade: the
    spmm section's numbers survive, and the gat section reports the
    explicit dataset-unavailable error instead of an opaque one."""
    rec, _ = _run_bench({"GAB_BENCH_FAULT": "rmat20_gcn_epoch"})
    assert rec["value"] is not None
    assert rec["extra"]["rmat20_spmm_ms"] > 0
    assert "rmat20_gcn_epoch_s" not in rec["extra"]
    assert "injected fault" in rec["errors"]["rmat20_gcn_epoch"]
    assert "dataset unavailable" in rec["errors"]["rmat20_gat_epoch"]
