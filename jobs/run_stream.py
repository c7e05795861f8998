"""Cluster job entry point for the streaming engine.

On a real multi-node cluster this is the submission path the north rule
names:

    ray job submit --working-dir . -- python jobs/run_stream.py \\
        --input '/data/stream/*.parquet' --out /data/out --epoch-files 32 \\
        --partitions 256 --auto-hot-keys

The script owns a Ray session ONLY when none exists (``ray job submit``
and the driver harness both pre-initialise); the engine library itself
never calls ``ray.init``.  Exit code 0 on a clean run, 2 when any input
file was dead-lettered and ``--strict`` is set.

Prints one JSON line: rows, throughput, watermark, failed files (top-10
sample), and per-partition metrics summary.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description="Run the transcript streaming engine")
    ap.add_argument("--input", required=True,
                    help="glob of input Parquet files (arrival order = sorted)")
    ap.add_argument("--out", required=True, help="output/checkpoint directory")
    ap.add_argument("--epoch-files", type=int, default=32)
    ap.add_argument("--partitions", type=int, default=32)
    ap.add_argument("--lateness-us", type=int, default=15_000_000)
    ap.add_argument("--session-gap-us", type=int, default=30_000_000)
    ap.add_argument("--join-gap-us", type=int, default=30_000_000)
    ap.add_argument("--tumbling-us", type=int, default=60_000_000)
    ap.add_argument("--auto-hot-keys", action="store_true")
    ap.add_argument("--no-dedup", action="store_true",
                    help="disable the streaming exact-dedup output stream")
    ap.add_argument("--dedup-ttl-us", type=int, default=None,
                    help="bound dedup state to an event-time horizon "
                         "(>= --lateness-us; hashes unseen for ttl re-emit)")
    ap.add_argument("--cep-pattern", default="user,tool,assistant",
                    help="comma-separated role sequence for the cep stream")
    ap.add_argument("--cep-within-us", type=int, default=120_000_000,
                    help="event-time span bound for CEP matches")
    ap.add_argument("--wtopk-k", type=int, default=3,
                    help="k for the per-window top-k tools stream")
    ap.add_argument("--timeout-within-us", type=int, default=30_000_000,
                    help="CEP-negation window: a user turn with no "
                         "assistant within this event-time span fires a "
                         "row on the timeouts stream")
    ap.add_argument("--compact", action="store_true",
                    help="compact committed epochs after the run")
    ap.add_argument("--compact-stream-mb", type=int, default=0,
                    help="cross-epoch re-layout: merge every stream's "
                         "committed epochs into ~N MiB files (0 = off)")
    ap.add_argument("--cep-pred", default=None,
                    help="predicated CEP stream: slots separated by ';;' "
                         "(or ',' when no ';;' present — legacy form, only "
                         "safe for regexes without commas), each slot "
                         "'role|tool|text_regex'; role/tool may not contain "
                         "'|' so the regex may (split is maxsplit=2); empty "
                         "segments mean don't-care, e.g. "
                         "'user||error;;tool|exec|;;assistant||(a|b){2,3}'")
    ap.add_argument("--emit-streams", default=None,
                    help="comma-separated optional output streams to enable "
                         "(sessions,windows,wstats,sliding,wdistinct,wtopk,"
                         "matches,timeouts,cep,cepk,dedup,wquant); default: "
                         "all. "
                         "Disabled streams skip their fold/state/emit cost "
                         "entirely. Must match across a resume chain.")
    ap.add_argument("--enrich", action="store_true",
                    help="emit the stream-table broadcast-join stream "
                         "(tool turns decorated with the static dim)")
    ap.add_argument("--max-open-rows-per-key", type=int, default=None,
                    help="per-key open-state bound: each raw-row state kind "
                         "(users/tools/cepbuf) keeps at most this many "
                         "ts-newest rows per conversation; force-dropped "
                         "counts land in the epoch markers (default: "
                         "unbounded/exact)")
    ap.add_argument("--wquant-ps", default=None,
                    help="comma-separated integer percents (e.g. '50,95') "
                         "to enable the windowed-percentile stream "
                         "(nearest-rank over post-scrub text length)")
    ap.add_argument("--reshard-from", type=int, default=None,
                    help="elastic rescale mode: re-split the checkpoint at "
                         "--out from THIS partition count to --partitions, "
                         "print the summary and exit (run before resuming "
                         "with the new --partitions; no input is read)")
    ap.add_argument("--prune-state", action="store_true",
                    help="checkpoint GC: drop state snapshots below the "
                         "newest all-full epoch after the run")
    ap.add_argument("--strict", action="store_true",
                    help="exit 2 if any input file failed")
    args = ap.parse_args(argv)

    import ray

    if not ray.is_initialized():
        ray.init(address=os.environ.get("RAY_ADDRESS", "auto"),
                 include_dashboard=False, logging_level="ERROR")

    from pdf_watermark_remover_ray.config import StreamConfig
    from pdf_watermark_remover_ray.pipelines.streaming import StreamingEngine

    paths = sorted(glob.glob(args.input))
    cep_terms = None
    if args.cep_pred:
        from pdf_watermark_remover_ray.stages.cep import Term

        def _slot(spec: str) -> Term:
            # role/tool can't contain '|'; maxsplit=2 keeps regex
            # alternation ('a|b') intact inside the third segment
            role, tool, rx = (spec.split("|", 2) + ["", "", ""])[:3]
            return Term(role=role or None, tool=tool or None,
                        text_regex=rx or None)

        sep = ";;" if ";;" in args.cep_pred else ","
        cep_terms = tuple(_slot(s) for s in args.cep_pred.split(sep) if s)
    if args.reshard_from is not None:
        from dataclasses import replace as _replace

        from pdf_watermark_remover_ray.state.reshard import (
            read_layout, reshard_checkpoint)

        base = StreamConfig(num_partitions=args.reshard_from,
                            lateness_us=args.lateness_us,
                            session_gap_us=args.session_gap_us,
                            join_gap_us=args.join_gap_us,
                            tumbling_us=args.tumbling_us,
                            dedup_ttl_us=args.dedup_ttl_us,
                            cep_within_us=args.cep_within_us,
                            max_open_rows_per_key=args.max_open_rows_per_key)
        lay = read_layout(args.out)  # hot keys + stream set are part of
        if lay:                      # the persisted layout: carry them over
            base = _replace(
                base, hot_keys=tuple(lay["hot_keys"]),
                emit_streams=tuple(lay["emit_streams"])
                if lay.get("emit_streams") is not None else None,
                wquant_ps=tuple(lay["wquant_ps"])
                if lay.get("wquant_ps") is not None else None)
        summary = reshard_checkpoint(
            args.out, base, _replace(base, num_partitions=args.partitions))
        print(json.dumps(summary))
        return 0

    cfg = StreamConfig(num_partitions=args.partitions,
                       cep_terms=cep_terms,
                       lateness_us=args.lateness_us,
                       session_gap_us=args.session_gap_us,
                       join_gap_us=args.join_gap_us,
                       tumbling_us=args.tumbling_us,
                       dedup_stream=not args.no_dedup,
                       dedup_ttl_us=args.dedup_ttl_us,
                       cep_pattern=tuple(r.strip()
                                         for r in args.cep_pattern.split(",")
                                         if r.strip()),
                       cep_within_us=args.cep_within_us,
                       wtopk_k=args.wtopk_k,
                       timeout_within_us=args.timeout_within_us,
                       emit_streams=tuple(
                           s.strip() for s in args.emit_streams.split(",")
                           if s.strip()) if args.emit_streams else None,
                       enrich_stream=args.enrich,
                       wquant_ps=tuple(int(x) for x in
                                       args.wquant_ps.split(","))
                       if args.wquant_ps else None,
                       max_open_rows_per_key=args.max_open_rows_per_key)
    eng = StreamingEngine(paths, args.out, cfg, epoch_files=args.epoch_files,
                          auto_hot_keys=args.auto_hot_keys)
    t0 = time.monotonic()
    res = eng.run()
    wall = time.monotonic() - t0
    if args.compact:
        eng.compact()
    if args.compact_stream_mb:
        from pdf_watermark_remover_ray.sinks.parquet import STREAMS, EpochSink

        sink = EpochSink(args.out)
        for stream in STREAMS:
            sink.compact_stream(stream,
                                target_bytes=args.compact_stream_mb << 20)
    if args.prune_state:
        eng.prune_state()
    rows = sum(m.get("rows", 0) for m in res.get("epochs", []))
    metrics = eng.metrics_df()
    summary = {
        "rows": int(rows),
        "wall_s": round(wall, 3),
        "rows_per_s": round(rows / wall, 1) if wall else None,
        "epochs": len(res.get("epochs", [])),
        "resumed_done": bool(res.get("resumed_done", False)),
        "all_succeeded": bool(res.get("all_succeeded", True)),
        "failed_files_sample": res.get("failed_files_sample", []),
        "hot_keys": list(eng.cfg.hot_keys),
        "partitions": eng.cfg.total_partitions,
        "max_partition_lag_us": (int(metrics["wm_lag_us"].max())
                                 if len(metrics) and "wm_lag_us" in metrics
                                 and metrics["wm_lag_us"].notna().any() else None),
    }
    print(json.dumps(summary))
    if args.strict and not summary["all_succeeded"]:
        return 2
    return 0


if __name__ == "__main__":
    sys.exit(main())
