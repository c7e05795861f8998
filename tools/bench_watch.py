"""Healthy-host bench watcher.

The shared VM's parallel capacity fluctuates (noisy neighbours); absolute
bench numbers are only comparable when the 32-way burn probe reports a
parallel speedup near the machine's real width.  This watcher loops:
probe every ``INTERVAL`` seconds; when TWO consecutive probes clear
``THRESHOLD``, run ``python bench.py`` (full sf0.1 / 32-cpu config) and —
only if the post-run probe STILL clears the threshold — record the line to
``BENCH_LOCAL.json``.  Exits after the first accepted run (or when
``--max-hours`` elapses).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
THRESHOLD = float(os.environ.get("PWR_HEALTH_THRESHOLD", "24"))
INTERVAL = int(os.environ.get("PWR_WATCH_INTERVAL", "120"))


def probe() -> float:
    out = subprocess.run([sys.executable, os.path.join(REPO, "tools", "host_health.py"), "32"],
                         capture_output=True, text=True, timeout=300)
    return json.loads(out.stdout.strip().splitlines()[-1])["parallel_speedup"]


def main() -> int:
    max_hours = 6.0
    for a in sys.argv[1:]:
        if a.startswith("--max-hours="):
            max_hours = float(a.split("=", 1)[1])
    deadline = time.time() + max_hours * 3600
    streak = 0
    while time.time() < deadline:
        try:
            p = probe()
        except Exception as ex:  # probe hiccup: keep watching
            print(f"probe error: {ex}", flush=True)
            time.sleep(INTERVAL)
            continue
        streak = streak + 1 if p >= THRESHOLD else 0
        print(f"probe {p:.1f}x (streak {streak})", flush=True)
        if streak >= 2:
            print("healthy window: running bench.py", flush=True)
            r = subprocess.run([sys.executable, os.path.join(REPO, "bench.py")],
                               capture_output=True, text=True, timeout=3600,
                               cwd=REPO)
            line = r.stdout.strip().splitlines()[-1] if r.stdout.strip() else ""
            try:
                rec = json.loads(line)
            except Exception:
                print(f"bench failed rc={r.returncode}: {r.stderr[-500:]}",
                      flush=True)
                streak = 0
                continue
            post = probe()
            rec["post_bench_probe"] = post
            if post >= THRESHOLD:
                with open(os.path.join(REPO, "BENCH_LOCAL.json"), "w") as f:
                    json.dump(rec, f, indent=1)
                print(f"ACCEPTED: headline {rec['value']}s, post-probe "
                      f"{post:.1f}x -> BENCH_LOCAL.json", flush=True)
                # same window: refresh the scaling evidence (8 vs 32 cpus)
                r2 = subprocess.run(
                    [sys.executable, os.path.join(REPO, "bench.py"),
                     "--scaling"], capture_output=True, text=True,
                    timeout=5400, cwd=REPO)
                line2 = r2.stdout.strip().splitlines()[-1] \
                    if r2.stdout.strip() else ""
                try:
                    rec2 = json.loads(line2)
                    rec2["post_bench_probe"] = probe()
                    if rec2["post_bench_probe"] >= THRESHOLD * 0.8:
                        with open(os.path.join(REPO, "BENCH_SCALING.json"),
                                  "w") as f:
                            json.dump(rec2, f, indent=1)
                        print(f"SCALING recorded: {rec2.get('scaling_efficiency')} "
                              f"-> BENCH_SCALING.json", flush=True)
                    else:
                        print("scaling run rejected: window degraded",
                              flush=True)
                except Exception:
                    print(f"scaling bench failed rc={r2.returncode}: "
                          f"{r2.stderr[-400:]}", flush=True)
                # same window: per-stream marginal-cost table (reduced rows)
                r3 = subprocess.run(
                    [sys.executable, os.path.join(REPO, "bench.py"),
                     "--streams-ab"], capture_output=True, text=True,
                    timeout=5400, cwd=REPO)
                line3 = r3.stdout.strip().splitlines()[-1] \
                    if r3.stdout.strip() else ""
                try:
                    rec3 = json.loads(line3)
                    if (rec3.get("host_parallel_speedup_after") or 0) \
                            >= THRESHOLD * 0.8:
                        with open(os.path.join(REPO, "BENCH_STREAMS_AB.json"),
                                  "w") as f:
                            json.dump(rec3, f, indent=1)
                        print("STREAMS-AB recorded -> BENCH_STREAMS_AB.json",
                              flush=True)
                    else:
                        print("streams-ab rejected: window degraded",
                              flush=True)
                except Exception:
                    print(f"streams-ab failed rc={r3.returncode}: "
                          f"{r3.stderr[-400:]}", flush=True)
                return 0
            # a rejected run is still the freshest HEAD-stamped evidence:
            # record it as the fallback (healthy START, degraded finish),
            # never overwriting the healthy-window record — and never
            # overwriting a strictly BETTER prior fallback (lower wall at a
            # comparable-or-healthier post-probe) with a degraded-window one
            rec["note"] = ("healthy-start fallback: pre-run probes >= "
                           f"{THRESHOLD}x twice, post-run probe {post:.1f}x "
                           "(degraded mid-run); BENCH_LOCAL.json keeps the "
                           "healthy-window record per the accept protocol")
            head_path = os.path.join(REPO, "BENCH_HEAD.json")
            keep_prior = False
            try:
                with open(head_path) as f:
                    prior = json.load(f)
                keep_prior = float(prior.get("value", 1e18)) <= float(rec["value"])
            except Exception:
                pass
            if keep_prior:
                print(f"rejected: post-bench probe {post:.1f}x; prior "
                      "BENCH_HEAD fallback is faster — keeping it", flush=True)
            else:
                with open(head_path, "w") as f:
                    json.dump(rec, f, indent=1)
                print(f"rejected: post-bench probe {post:.1f}x "
                      f"(ran into a degraded window) -> BENCH_HEAD.json fallback",
                      flush=True)
            streak = 0
        time.sleep(INTERVAL)
    print("no healthy window found", flush=True)
    return 1


if __name__ == "__main__":
    sys.exit(main())
