"""Run the (1 executor, 4 executors) local-cluster pair for the
composed dedup DAG (or the extraction job) and print one JSON line
with throughputs, efficiency, and spin-probe ceilings.

This is the measurement VERDICT.md round-4 item 1 asked for: the same
total-core scale-up as the local[8] -> local[32] thread pair, but with
executor-count scaling — each executor its own JVM/BlockManager/
shuffle machinery — so the single-JVM-contention hypothesis for the
0.373 end-to-end number is tested, not argued.

Usage: python tools/cluster_pair.py [job] [mult]
  job:  dedup (default) | extract
  mult: corpus multiplier for dedup (default 320)

Protocol (same discipline as bench.py's scaling leg):
  * small leg taskset-pinned to exactly its 8 cores; wide leg owns the
    box (32 task cores + driver threads, the same allowance the
    local[32] legs had);
  * fresh driver+executor JVMs per leg (subprocess);
  * spin ceiling 8->32 probed before and after;
  * min-of-3 reps after 2 warm-ups (inside cluster_probe.py).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _spin(workers: int, seconds: float = 3.0) -> int:
    import multiprocessing as mp

    q = mp.Queue()

    def w(q):
        import time as _t
        end = _t.time() + seconds
        x = n_iter = 0
        while _t.time() < end:
            for _ in range(10000):
                x = (x * 1103515245 + 12345) & 0x7FFFFFFF
            n_iter += 10000
        q.put(n_iter)

    ps = [mp.Process(target=w, args=(q,)) for _ in range(workers)]
    [p.start() for p in ps]
    total = sum(q.get() for _ in ps)
    [p.join() for p in ps]
    return total


def _ceiling() -> float:
    return round((_spin(32) / _spin(8)) / 4.0, 3)


def _leg(n_exec: int, cores: int, job: str, mult: int, pin: bool) -> dict:
    cmd = ["python", os.path.join(REPO, "tools", "cluster_probe.py"),
           str(n_exec), str(cores), job]
    total = n_exec * cores
    if pin:
        cmd = ["taskset", "-c", f"0-{total - 1}"] + cmd
    env = dict(os.environ, CORPUS_PROBE_MULT=str(mult))
    out = subprocess.run(cmd, capture_output=True, text=True,
                         timeout=3600, env=env)
    line = out.stdout.strip().splitlines()[-1]
    return json.loads(line)


def main():
    job = sys.argv[1] if len(sys.argv) > 1 else "dedup"
    mult = int(sys.argv[2]) if len(sys.argv) > 2 else 320

    c_before = _ceiling()
    lo = _leg(1, 8, job, mult, pin=True)
    hi = _leg(4, 8, job, mult, pin=False)
    c_after = _ceiling()

    eff = (lo["best_sec"] / hi["best_sec"]) / 4.0
    print(json.dumps({
        "job": job,
        "mult": mult if job == "dedup" else None,
        "pair": ["local-cluster[1,8]", "local-cluster[4,8]"],
        "n_rows": lo["n_rows"],
        "t_1x8_sec": lo["best_sec"],
        "t_4x8_sec": hi["best_sec"],
        "times_1x8": lo["times_sec"],
        "times_4x8": hi["times_sec"],
        "throughput_1x8": lo["throughput_rows_per_sec"],
        "throughput_4x8": hi["throughput_rows_per_sec"],
        "speedup": round(lo["best_sec"] / hi["best_sec"], 3),
        "efficiency": round(eff, 3),
        "cpu_ceiling_before": c_before,
        "cpu_ceiling_after": c_after,
        "efficiency_vs_ceiling": round(eff / min(c_before, c_after), 3),
        "loadavg_1m": round(os.getloadavg()[0], 2),
    }))


if __name__ == "__main__":
    main()
