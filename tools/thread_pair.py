"""Pinned (N, 4N) thread-mode pair for the extraction job — one JSON
line with throughputs, efficiency, and spin ceilings.

Exists so single (N, 4N) datums (e.g. the 2→8 pair VERDICT round-4
item 7 asked for) can be captured without re-running the full bench:
same protocol as bench.py's scaling leg (taskset-pinned legs with the
rest of the box as a co-tenant buffer, fresh JVM per leg via
tools/scaling_probe.py, min-of-3 after warm-ups, spin ceilings probed
before and after).

Usage: python tools/thread_pair.py <lo> <hi> [corpus_path]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools.cluster_pair import _spin  # noqa: E402  (same probe)


def _ceiling(lo: int, hi: int) -> float:
    return round((_spin(hi) / _spin(lo)) / (hi / lo), 3)


def _leg(cores: int, corpus: str, pin: bool) -> dict:
    cmd = ["python", os.path.join(REPO, "tools", "scaling_probe.py"),
           str(cores), corpus]
    if pin:
        cmd = ["taskset", "-c", f"0-{cores - 1}"] + cmd
    out = subprocess.run(cmd, capture_output=True, text=True, timeout=3600)
    return json.loads(out.stdout.strip().splitlines()[-1])


def main():
    lo, hi = int(sys.argv[1]), int(sys.argv[2])
    corpus = sys.argv[3] if len(sys.argv) > 3 else \
        os.path.join(REPO, ".bench_cache", "transcripts_sf0.1_x80.parquet")

    c_before = _ceiling(lo, hi)
    r_lo = _leg(lo, corpus, pin=True)
    r_hi = _leg(hi, corpus, pin=hi < 32)
    c_after = _ceiling(lo, hi)

    eff = (r_lo["best_sec"] / r_hi["best_sec"]) / (hi / lo)
    print(json.dumps({
        "pair": [lo, hi],
        "n_turns": r_lo["n_turns"],
        f"t_local{lo}_sec": r_lo["best_sec"],
        f"t_local{hi}_sec": r_hi["best_sec"],
        f"times_local{lo}": r_lo["times_sec"],
        f"times_local{hi}": r_hi["times_sec"],
        f"throughput_local{lo}": r_lo["throughput_turns_per_sec"],
        f"throughput_local{hi}": r_hi["throughput_turns_per_sec"],
        "speedup": round(r_lo["best_sec"] / r_hi["best_sec"], 3),
        "efficiency": round(eff, 3),
        "cpu_ceiling_before": c_before,
        "cpu_ceiling_after": c_after,
        "efficiency_vs_ceiling": round(eff / min(c_before, c_after), 3),
        "loadavg_1m": round(os.getloadavg()[0], 2),
    }))


if __name__ == "__main__":
    main()
