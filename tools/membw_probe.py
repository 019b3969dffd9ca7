"""Memory-bandwidth scaling ceiling: the STREAM-like twin of the
pure-CPU spin probe.

The spin probe (bench.py _spin) measures register-arithmetic scaling —
8→32 processes reach ~0.88-0.93 on this box.  But the dedup DAG's
compute is string/hash streaming (regex normalize, md5, shingling,
Arrow serialization): DRAM-bound, not ALU-bound.  A box has ONE memory
subsystem shared by all 32 vCPUs, whereas 4N cluster nodes bring 4N
memory controllers — so for memory-streaming work the single-box
scaling ceiling is the bandwidth ratio measured here, not the spin
ratio.  Each worker repeatedly sums a 256 MB float64 array (numpy —
pure sequential DRAM reads, no allocation in the timed loop); reported
is aggregate GB/s at each width and the lo→hi scaling ratio.

Usage: python tools/membw_probe.py [lo] [hi]   (default 8 32)
"""

from __future__ import annotations

import json
import multiprocessing as mp
import sys
import time

ARR_MB = 256
SECONDS = 4.0


def _worker(q):
    import numpy as np

    a = np.ones(ARR_MB * 1024 * 1024 // 8, dtype=np.float64)
    a.sum()  # touch pages
    end = time.time() + SECONDS
    n = 0
    while time.time() < end:
        a.sum()
        n += 1
    q.put(n * ARR_MB / 1024.0)  # GB scanned


def _bw(workers: int) -> float:
    q = mp.Queue()
    ps = [mp.Process(target=_worker, args=(q,)) for _ in range(workers)]
    t0 = time.time()
    [p.start() for p in ps]
    total_gb = sum(q.get() for _ in ps)
    [p.join() for p in ps]
    return total_gb / (time.time() - t0)


def main():
    lo = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    hi = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    bw1 = _bw(1)
    bw_lo = _bw(lo)
    bw_hi = _bw(hi)
    print(json.dumps({
        "arr_mb": ARR_MB,
        "gbps_1": round(bw1, 2),
        f"gbps_{lo}": round(bw_lo, 2),
        f"gbps_{hi}": round(bw_hi, 2),
        "scaling_ratio": round(bw_hi / bw_lo, 3),
        "membw_ceiling": round((bw_hi / bw_lo) / (hi / lo), 3),
        "saturation_at_lo": round(bw_lo / (lo * bw1), 3),
    }))


if __name__ == "__main__":
    main()
