"""The bench regression gate: pinned calm-window baseline + flag logic.

bench.py appends baseline comparison fields to its JSON line whenever the
run's sf/cpus match BASELINE-ENGINE.json's. The gate is exercised here on
synthetic results (a full bench run is minutes, not test-suite material);
the round's real bench output is the driver's BENCH_r{N}.json.
"""

from __future__ import annotations

import json
import os

import bench

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _baseline() -> dict:
    with open(os.path.join(REPO, "BASELINE-ENGINE.json")) as fh:
        return json.load(fh)


def test_baseline_pin_is_well_formed():
    b = _baseline()
    assert b["sf"] == 0.1 and b["cpus"] == 32
    assert b["docs_per_sec_calm"] > 0
    assert 0 < b["regression_threshold"] < 1


def test_gate_flags_only_real_regressions():
    b = _baseline()
    pin = b["docs_per_sec_calm"]
    ok = bench.regression_check({"sf": 0.1, "cpus": 32, "docs_per_sec": pin * 0.9}, b)
    assert ok["regression_flag"] is False and ok["vs_baseline"] == 0.9
    bad = bench.regression_check({"sf": 0.1, "cpus": 32, "docs_per_sec": pin * 0.5}, b)
    assert bad["regression_flag"] is True
    # boundary: exactly at the threshold is NOT a regression
    edge = bench.regression_check(
        {"sf": 0.1, "cpus": 32, "docs_per_sec": pin * (1 - b["regression_threshold"])}, b
    )
    assert edge["regression_flag"] is False


def test_gate_skips_mismatched_scale():
    b = _baseline()
    assert bench.regression_check({"sf": 0.01, "cpus": 32, "docs_per_sec": 1.0}, b) == {}
    assert bench.regression_check({"sf": 0.1, "cpus": 8, "docs_per_sec": 1.0}, b) == {}


def test_gate_noise_aware_normalization():
    b = _baseline()
    pin, spin_pin = b["docs_per_sec_calm"], b["spin_mops_calm"]
    # storm window: raw halves BUT delivered CPU also halved → normalized
    # ≈ 1.0 → not a regression
    storm = bench.regression_check(
        {"sf": 0.1, "cpus": 32, "docs_per_sec": pin * 0.5,
         "spin_mops_before": spin_pin * 0.5, "spin_mops_after": spin_pin * 0.5},
        b,
    )
    assert storm["vs_baseline_norm"] == 1.0
    assert storm["regression_flag"] is False
    # real regression: raw halves while the host delivered full CPU
    real = bench.regression_check(
        {"sf": 0.1, "cpus": 32, "docs_per_sec": pin * 0.5,
         "spin_mops_before": spin_pin, "spin_mops_after": spin_pin},
        b,
    )
    assert real["vs_baseline_norm"] == 0.5
    assert real["regression_flag"] is True
    # no probes in the run → falls back to the raw-only flag
    raw_only = bench.regression_check(
        {"sf": 0.1, "cpus": 32, "docs_per_sec": pin * 0.5}, b
    )
    assert "vs_baseline_norm" not in raw_only
    assert raw_only["regression_flag"] is True


def test_gate_bandwidth_normalization():
    """The spin-blind regime (BENCH/BASELINE.md ninth batch): ALU probe
    reads calm while DRAM delivery halved and docs/s halved with it —
    the bw-norm must clear the flag; a true regression (all probes calm,
    docs/s down) must keep it."""
    b = _baseline()
    pin, spin_pin = b["docs_per_sec_calm"], b["spin_mops_calm"]
    bw_pin = b["bw_gbs_calm"]
    depressed_bw = bench.regression_check(
        {"sf": 0.1, "cpus": 32, "docs_per_sec": pin * 0.5,
         "spin_mops_before": spin_pin, "spin_mops_after": spin_pin,
         "bw_gbs_before": bw_pin * 0.5, "bw_gbs_after": bw_pin * 0.5},
        b,
    )
    assert depressed_bw["vs_baseline_bw_norm"] == 1.0
    assert depressed_bw["regression_flag"] is False
    real = bench.regression_check(
        {"sf": 0.1, "cpus": 32, "docs_per_sec": pin * 0.5,
         "spin_mops_before": spin_pin, "spin_mops_after": spin_pin,
         "bw_gbs_before": bw_pin, "bw_gbs_after": bw_pin},
        b,
    )
    assert real["vs_baseline_bw_norm"] == 0.5
    assert real["regression_flag"] is True


def test_gate_reference_job_normalization():
    """The frozen-reference-job normalizer: when the whole Spark stack
    runs 4x slow (ref job 4x its pin) and docs/s dropped 4x with it, the
    engine is unchanged — no flag. When the ref job runs at pin speed
    but docs/s halved, the engine regressed — flag (all probes calm)."""
    b = _baseline()
    pin, spin_pin = b["docs_per_sec_calm"], b["spin_mops_calm"]
    bw_pin, ref_pin = b["bw_gbs_calm"], b["ref_job_sec_calm"]
    calm_probes = {
        "spin_mops_before": spin_pin, "spin_mops_after": spin_pin,
        "bw_gbs_before": bw_pin, "bw_gbs_after": bw_pin,
    }
    depressed_stack = bench.regression_check(
        {"sf": 0.1, "cpus": 32, "docs_per_sec": pin * 0.25,
         "ref_job_sec": ref_pin * 4.0, **calm_probes}, b)
    assert depressed_stack["vs_baseline_ref_norm"] == 1.0
    assert depressed_stack["regression_flag"] is False
    real = bench.regression_check(
        {"sf": 0.1, "cpus": 32, "docs_per_sec": pin * 0.5,
         "ref_job_sec": ref_pin, **calm_probes}, b)
    assert real["vs_baseline_ref_norm"] == 0.5
    assert real["regression_flag"] is True
    # pin-run replay: everything at pin values → all ratios exactly 1.0
    replay = bench.regression_check(
        {"sf": 0.1, "cpus": 32, "docs_per_sec": pin,
         "ref_job_sec": ref_pin, **calm_probes}, b)
    assert replay["vs_baseline"] == 1.0
    assert replay["vs_baseline_ref_norm"] == 1.0
    assert replay["regression_flag"] is False
