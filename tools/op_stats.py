"""Per-stage execution stats for any registered query.

``PYTHONPATH=/root/repo python tools/op_stats.py <query> [sf_dir]`` runs one
``queries()`` entry and prints Ray Data's per-operator stats (wall time,
rows, memory per stage) — the feedback loop for checking that an operator's
wall time is dominated by useful compute rather than scheduling, format
conversion, or a surprise shuffle.  Dataset-returning queries report the
real streamed plan; driver-finished queries (tiny aggregates) report their
wall time only.
"""

from __future__ import annotations

import sys
import time


def main() -> int:
    import ray

    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    ray.init(address="local", num_cpus=8, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import __ray_entry__ as e

    fn = e.queries()[name]
    t0 = time.monotonic()
    res = fn(sf_dir)
    if hasattr(res, "materialize"):
        res = res.materialize()
        wall = time.monotonic() - t0
        print(res.stats())
    else:
        wall = time.monotonic() - t0
        print(f"(driver-finished result: {type(res).__name__}, "
              f"{len(res)} rows — no Dataset stats)")
    print(f"\n== {name} wall: {wall:.2f}s over {sf_dir}")
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
