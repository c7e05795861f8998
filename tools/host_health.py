"""Shared-VM parallel-capacity probe.

Runs an N-way CPU burn (pure-python loop per process) and reports the
parallel speedup vs a single-process burn.  On a healthy 32-core host the
speedup is ~24-32×; shared-VM noisy neighbours push it far lower — which
hits the 32-CPU bench level much harder than the 8-CPU one and depresses
the measured scaling efficiency.  Used to decide WHEN to (re)run
``bench.py --scaling``, not part of the engine.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import sys
import time


def _burn(n: int) -> int:
    s = 0
    for i in range(n):
        s += i * i
    return s


def _timed_burn(args) -> float:
    n, = args
    t0 = time.monotonic()
    _burn(n)
    return time.monotonic() - t0


def probe(workers: int = 32, n: int = 4_000_000) -> dict:
    t0 = time.monotonic()
    _burn(n)
    solo = time.monotonic() - t0
    with mp.Pool(workers) as pool:
        t0 = time.monotonic()
        times = pool.map(_timed_burn, [(n,)] * workers)
        wall = time.monotonic() - t0
    speedup = workers * solo / wall if wall else 0.0
    return {"workers": workers, "solo_s": round(solo, 3), "wall_s": round(wall, 3),
            "parallel_speedup": round(speedup, 1),
            "max_worker_s": round(max(times), 3)}


if __name__ == "__main__":
    w = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    print(json.dumps(probe(w)))
