#!/usr/bin/env python3
"""Corpus-size sweep for the N→4N criterion: run the 4→16 paired-round
protocol (scaling_bench.paired_rounds, spin-normalized) at a chosen corpus
size. Short wide-trials (60-120k docs) fit inside the shared VM's calm
windows and measure the engine's true scaling; long ones measure the
host's noise (see BENCH/BASELINE.md).

Run: python scripts/size_sweep.py <n_docs> <rounds> [lo] [hi]
"""
import json
import subprocess
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import scaling_bench as SB

n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 60_000
rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3
lo = int(sys.argv[3]) if len(sys.argv) > 3 else 4
hi = int(sys.argv[4]) if len(sys.argv) > 4 else 16

pages = SB.ensure_fixture(n_docs)
out = f"/tmp/size_out_{n_docs}"
subprocess.run(["rm", "-rf", out], check=True)
pairs = SB.paired_rounds(lo, hi, pages, out, rounds)
subprocess.run(["rm", "-rf", out], check=True)
print(json.dumps({"n_docs": n_docs, "lo": lo, "hi": hi, "rounds": pairs}))
