"""Offline single-partition close/route profiler.

The method that found every real close-path win so far (BASELINE.md
"Close-path Arrow rewrites"): construct a ``StatePartition`` DIRECTLY (no
Ray, no actors), feed it the exact prepared/partition-sliced tables the
route tasks would send, and cProfile ``close_epoch`` — isolating real CPU
cost from scheduler/noisy-neighbour contention, which on this shared VM
makes end-to-end wall times unattributable.

Usage::

    python tools/profile_close.py [--files 16] [--epochs 2] [--mode close]
    python tools/profile_close.py --mode route   # driver-side route CPU

``--mode close`` ingests each epoch's partition-0 fold + dedup slices and
profiles the two ``close_epoch`` calls (steady-state, advancing watermark —
NOT the flush close, whose emit-everything shape differs).  ``--mode
route`` profiles the per-file read → scrub → prepare → stage → slice path
with ingestion stubbed out.  Input comes from the bench generator cache
(``bench.ensure_bench_input`` shape) or any directory of transcript
parquet via ``--in-dir``.
"""

from __future__ import annotations

import argparse
import cProfile
import glob
import io
import os
import pstats
import sys
import tempfile
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pdf_watermark_remover_ray.config import StreamConfig
from pdf_watermark_remover_ray.functions.scrub import make_scrub_batch_fn
from pdf_watermark_remover_ray.pipelines import streaming as S


def load_epoch_tables(files, cfg, scrub_fn):
    """Prepared tables for one epoch, as the route tasks would build them."""
    cols = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    out = []
    for f in files:
        t = pq.read_table(f, columns=cols)
        out.append(S._prepare_table(t, scrub_fn, cfg.num_partitions,
                                    cfg.hot_keys, cep_terms=cfg.cep_terms))
    return out


def slice_partition(t: pa.Table, pid: int, cfg: StreamConfig):
    """(fold slice, dedup slice) of one prepared table for one partition."""
    part = t["part"].to_numpy(zero_copy_only=False)
    cols = S._INGEST_COLS + (["pbits"] if "pbits" in t.column_names else [])
    fold = t.select(cols).filter(pa.array(part == pid))
    narrow, bounds = S._dedup_slices(t, cfg.num_partitions)
    lo, hi = int(bounds[pid]), int(bounds[pid + 1])
    ded = narrow.slice(lo, hi - lo) if hi > lo else None
    return fold, ded


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--files", type=int, default=16)
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--mode", choices=["close", "route"], default="close")
    ap.add_argument("--partitions", type=int, default=32)
    ap.add_argument("--in-dir", default=None)
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--dump", default=None)
    args = ap.parse_args()

    in_dir = args.in_dir
    if in_dir is None:
        cands = sorted(glob.glob("/tmp/pwr_bench_cache/*/in"))
        if not cands:
            print("no bench cache; run bench.py once or pass --in-dir",
                  file=sys.stderr)
            return 1
        in_dir = cands[-1]
    files = sorted(glob.glob(os.path.join(in_dir, "part-*.parquet")))
    files = files[: args.files]
    if not files:
        print(f"no part-*.parquet under {in_dir}", file=sys.stderr)
        return 1

    cfg = StreamConfig(num_partitions=args.partitions)
    scrub_fn = make_scrub_batch_fn(cfg.scrub)
    per_epoch = max(1, len(files) // args.epochs)

    if args.mode == "route":
        sink_dir = tempfile.mkdtemp(prefix="pwr_profile_route_")
        sink = S.EpochSink(sink_dir)

        def route_cpu():
            for i, f in enumerate(files):
                t = pq.read_table(
                    f, columns=["conv_id", "turn_idx", "role", "text",
                                "tool", "ts"])
                t = S._prepare_table(t, scrub_fn, cfg.num_partitions,
                                     cfg.hot_keys, cep_terms=cfg.cep_terms)
                ts = t["ts_us"].to_numpy(zero_copy_only=False)
                late_mask = pa.array(ts < -10**18)
                live = t.filter(pa.array(~late_mask.to_numpy(
                    zero_copy_only=False)))
                S._emit_turns_file(sink, live, 0, i)
                # fold + dedup slicing for every partition (ingest stubbed)
                part = live["part"].to_numpy(zero_copy_only=False)
                order = np.argsort(part, kind="stable")
                cols = S._INGEST_COLS + (
                    ["pbits"] if "pbits" in live.column_names else [])
                live.select(cols).take(pa.array(order))
                S._dedup_slices(live, cfg.num_partitions)

        t0 = time.monotonic()
        pr = cProfile.Profile()
        pr.enable()
        route_cpu()
        pr.disable()
        wall = time.monotonic() - t0
        n = sum(pq.read_metadata(f).num_rows for f in files)
        print(f"route mode: {len(files)} files, {n} rows, {wall:.2f} s "
              f"({n / wall / 1e6:.2f} M rows/s single-core)")
        buf = io.StringIO()
        pstats.Stats(pr, stream=buf).sort_stats("cumulative").print_stats(args.top)
        print("\n".join(buf.getvalue().splitlines()[4: 4 + args.top + 8]))
        return 0

    # close mode
    out = tempfile.mkdtemp(prefix="pwr_profile_close_")
    sp = S.StatePartition(0, cfg, out, restore_epoch=-1)
    epochs = []
    max_ts = -(10**18)
    for e in range(args.epochs):
        batch = files[e * per_epoch: (e + 1) * per_epoch]
        tables = load_epoch_tables(batch, cfg, scrub_fn)
        rows = 0
        for i, t in enumerate(tables):
            fold, ded = slice_partition(t, 0, cfg)
            sp.ingest_pair(e, fold, ded, f"f{e}-{i}")
            rows += len(fold)
            ts = t["ts_us"].to_numpy(zero_copy_only=False)
            if len(ts):
                max_ts = max(max_ts, int(ts.max()))
        epochs.append((e, rows, max_ts - cfg.lateness_us))
    print(f"ingested: {[(e, r) for e, r, _ in epochs]} rows/epoch "
          f"(partition 0 of {cfg.num_partitions})")

    pr = cProfile.Profile()
    wm_prev = -(10**18)
    total = 0.0
    for e, rows, wm_after in epochs:
        t0 = time.monotonic()
        pr.enable()
        stats = sp.close_epoch(e, wm_prev, wm_after)
        pr.disable()
        dt = time.monotonic() - t0
        total += dt
        wm_prev = wm_after
        ss = stats.get("stream_s") or {}
        top = sorted(ss.items(), key=lambda kv: -kv[1])[:8]
        print(f"epoch {e}: {rows} rows closed in {dt:.3f} s; stream_s: "
              + ", ".join(f"{k}={v:.3f}" for k, v in top))
    print(f"total close: {total:.3f} s")
    buf = io.StringIO()
    pstats.Stats(pr, stream=buf).sort_stats("cumulative").print_stats(args.top)
    print("\n".join(buf.getvalue().splitlines()[4: 4 + args.top + 8]))
    if args.dump:
        pr.dump_stats(args.dump)
        print(f"pstats dumped to {args.dump}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
