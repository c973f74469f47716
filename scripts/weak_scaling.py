#!/usr/bin/env python3
"""Weak-scaling evidence: fixed work PER CORE while cores and data grow
together — the shape a crawl pipeline actually scales in (a 4x bigger
cluster ingests a 4x bigger crawl; nobody adds executors to keep the
input fixed). Complements scripts/scaling_bench.py's strong-scaling
protocol (same input, more cores) with the other standard HPC rendering
of the north rule's N->4N criterion:

    weak_eff = (docs/s at 4N cores on 4x docs) / (docs/s at N cores) / 4

Ideal 1.0 - the engine turns 4x resources into 4x throughput at 4x data.
Methodologically this pair is FAIRER on a noisy shared host than strong
scaling at a fixed big corpus: both trials of a round run for comparable
wall time (~work/cores is constant), so the wide trial is no longer a
short noise hostage sampled against a long narrow trial.

Corpora: the same seeded generator at base_docs and 4*base_docs
(identical per-doc distribution; throughput-ratio efficiency cancels the
residual doc-count difference from quarantine classes).

Run:  python scripts/weak_scaling.py [base_docs] [rounds]
      (base 60000 -> pairs 60k@4 vs 240k@16, and 60k@8 vs 240k@32:
       7.5k docs/core on the second pair as well)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from scaling_bench import (  # noqa: E402
    LevelRunner,
    cpu_baseline,
    ensure_fixture,
    spin_probe,
)


def weak_rounds(lo: int, hi: int, pages_lo: str, pages_hi: str,
                out: str, rounds: int):
    """K paired rounds: (lo cores on the base corpus, hi cores on the
    4x corpus) back-to-back, same protocol as scaling_bench.paired_rounds
    (spin probes before each trial; respawn-once on a wedged runner)."""
    rl = LevelRunner(lo, pages_lo, out)
    rh = LevelRunner(hi, pages_hi, out)
    rl.wait_ready()
    rh.wait_ready()
    pairs = []
    k = 0
    respawns = 0
    while k < rounds:
        try:
            mops_lo = spin_probe(lo)
            a = rl.trial(f"w{k}")
            mops_hi = spin_probe(hi)
            b = rh.trial(f"w{k}")
        except (TimeoutError, RuntimeError) as exc:
            print(f"  WEAK ROUND {lo}->{hi} #{k} LOST: {exc}", file=sys.stderr)
            rl.kill()
            rh.kill()
            respawns += 1
            if respawns > 2:
                print("  too many respawns; partial batch", file=sys.stderr)
                break
            rl = LevelRunner(lo, pages_lo, out)
            rh = LevelRunner(hi, pages_hi, out)
            rl.wait_ready()
            rh.wait_ready()
            continue
        eff = (b["docs_per_sec"] / a["docs_per_sec"]) / (hi / lo)
        norm = (b["docs_per_sec"] / mops_hi) / (a["docs_per_sec"] / mops_lo)
        pairs.append({
            "round": k, "lo": a, "hi": b, "eff": round(eff, 3),
            "mops_lo": mops_lo, "mops_hi": mops_hi,
            "norm_eff": round(norm, 3),
        })
        print(
            f"  WEAK ROUND {lo}->{hi} #{k}: eff={eff:.3f} norm={norm:.3f} "
            f"(mops {mops_lo}->{mops_hi}; walls {a['wall_sec']}s/"
            f"{b['wall_sec']}s)",
            file=sys.stderr,
        )
        k += 1
    rl.quit()
    rh.quit()
    return pairs


def main() -> None:
    base = int(sys.argv[1]) if len(sys.argv) > 1 else 60_000
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    pages_lo = ensure_fixture(base)
    pages_hi = ensure_fixture(4 * base)
    out = f"/tmp/weak_out_{base}"
    subprocess.run(["rm", "-rf", out], check=True)

    infra = cpu_baseline()
    print(f"  infra Mops/s by procs: {infra}", file=sys.stderr)

    p416 = weak_rounds(4, 16, pages_lo, pages_hi, out, rounds)
    subprocess.run(["rm", "-rf", out], check=True)
    p832 = weak_rounds(8, 32, pages_lo, pages_hi, out, rounds)
    subprocess.run(["rm", "-rf", out], check=True)

    def stats(pairs):
        if not pairs:
            return {"median_eff": None, "best_eff": None, "rounds": []}
        effs = sorted(p["eff"] for p in pairs)
        mid = len(effs) // 2
        med = effs[mid] if len(effs) % 2 else (effs[mid - 1] + effs[mid]) / 2
        return {"median_eff": round(med, 3),
                "best_eff": max(effs), "rounds": pairs}

    s416, s832 = stats(p416), stats(p832)
    i416 = round((infra[16] / infra[4]) / 4, 3)
    i832 = round((infra[32] / infra[8]) / 4, 3)

    def tbl(pairs):
        return "\n".join(
            f"| {p['round']} | {p['lo']['docs_per_sec']} "
            f"({p['lo']['wall_sec']}s) | {p['hi']['docs_per_sec']} "
            f"({p['hi']['wall_sec']}s) | {p['eff']} | {p['norm_eff']} |"
            for p in pairs
        )

    os.makedirs(f"{REPO}/BENCH", exist_ok=True)
    # Sidecar per-run snapshot; BENCH/BASELINE.md is hand-merged history.
    with open(f"{REPO}/BENCH/WEAK_SCALING_LAST_RUN.md", "w") as f:
        f.write(f"""# Weak scaling (fixed docs/core): {base} docs @ N cores vs {4 * base} @ 4N

weak_eff = (docs/s @4N on 4x docs) / (docs/s @N on base docs) / 4; ideal
1.0. Both trials of a round run comparable wall time (constant work per
core), removing strong-scaling's short-wide-trial noise asymmetry. Spin
probes before each trial; norm_eff divides out delivered host CPU.

## 4 cores @ {base} docs -> 16 cores @ {4 * base} docs

| round | docs/s @4 (wall) | docs/s @16 (wall) | eff | norm |
|---|---|---|---|---|
{tbl(p416)}

**median = {s416['median_eff']}, best = {s416['best_eff']}** (host spin ceiling this run: {i416})

## 8 cores @ {base} docs -> 32 cores @ {4 * base} docs

| round | docs/s @8 (wall) | docs/s @32 (wall) | eff | norm |
|---|---|---|---|---|
{tbl(p832)}

**median = {s832['median_eff']}, best = {s832['best_eff']}** (host spin ceiling this run: {i832})

Reproduce: `python scripts/weak_scaling.py {base} {rounds}`
""")
    print(json.dumps({
        "weak_4_16": s416, "weak_8_32": s832, "infra_mops": infra,
        "infra_eff_4_16": i416, "infra_eff_8_32": i832,
    }))


if __name__ == "__main__":
    main()
