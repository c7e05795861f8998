"""The streaming epoch driver: micro-batched CEP over an unbounded transcript
stream with stateful partitions, watermarks and an exactly-once sink.

This is the engine's flagship pipeline — the reference's batch-folder loop
(``mechanisms/watermark_processor.py:246-262``: sequential per-file map with
failure isolation, progress counters and an end-of-run summary) extended into
true streaming per the north rule.  One epoch ≙ one folder batch; the
watermark replaces the implicit "files arrive in listdir order" assumption;
the staged sink + marker replaces temp-file + ``copy2``; the state snapshot
replaces nothing (the reference has no resume) but follows its write-once
marker-file idiom (``ui/dialog_windows.py:31-35``).

Dataflow per epoch e (bounded replayable prefix of the stream):

    route tasks (one per input file, row-group-batched):
        read → scrub → late-split vs wm_after(e−1) → stage sorted turn/late
        parquet → ingest NARROW fold columns into the partition state actors
    actors.close_epoch(e, wm_prev, wm_after):
        fold sessions/windows/sliding/join state, emit watermark-closed
        results, stage state snapshot          # overlaps route of epoch e+1
    sink.commit_epoch(e, marker)               # atomic publish; marker IS
                                               #   the commit point

Determinism: the watermark after epoch e is ``max(ts over epochs ≤ e) −
lateness`` — a pure function of input + epoch slicing — and every emission
rule is strict against it, so a killed run resumed from the last marker
re-emits byte-identical rows (tests/test_streaming.py).

Emission rules (all STRICT so no non-late future row can contradict them;
a future non-late arrival in epoch f has ts ≥ wm_after(f−1) ≥ wm_after(e)):

- turn rows:     emitted at route time for their arrival epoch (late ones go
                 to the ``late`` dead-letter stream instead — the late
                 decision needs only wm_after(e−1), known before e routes);
- sessions:      closed when ``end_us < wm_after − gap`` (no joinable future);
- tumbling win:  emitted when ``window_start + size ≤ wm_after``;
- sliding win:   bucket counts folded per epoch; windows with
                 ``ws ≤ wm_after − size`` rolled up and emitted once;
- join matches:  a tool turn fires when ``ts < wm_after``, matched to the
                 latest buffered user turn within the gap (ties → larger
                 turn_idx, same as the batch oracle in stages/join.py).
"""

from __future__ import annotations

import os
import time
from collections import deque

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray
import ray.data

from ..config import StreamConfig
from ..functions.scrub import make_scrub_batch_fn
from ..sinks.parquet import EpochSink
from ..stages.partition import partition_table
from ..stages.windows import wtopk_project
from ..state.reshard import (checkpoint_state_path, layout_matches,
                             layout_of, read_layout, write_layout)
from ..state.store import (SortedStateStore, merge_session_intervals,
                           merge_sorted_append)

INF_US = (1 << 62)

TURN_COLS = ["conv_id", "turn_idx", "role", "text", "tool", "ts", "modified",
             "epoch", "lineage"]


class StatePartition:
    """One hash partition's keyed state (SURVEY.md §2.4 ST5).

    Constructed once per partition and reused across every epoch of the run —
    the actor-pool analog of the reference's single ``WatermarkProcessor``
    instance reused for every file (``main/remove_watermark.py:53``).
    Ingestion is idempotent (tables keyed by their deterministic source unit),
    so Ray task retries cannot double-count.
    """

    def __init__(self, partition_id: int, cfg: StreamConfig, out_dir: str,
                 restore_epoch: int = -1):
        self.pid = partition_id
        self.cfg = cfg
        self.sink = EpochSink(out_dir)
        # Per-epoch ingest buffers: keyed by epoch so routing of epoch e+1 may
        # overlap with (pipelined) close of epoch e without mixing rows; inner
        # dict keyed by deterministic source key for retry idempotence.
        self.buffer: dict[int, dict[str, pa.Table]] = {}
        # Second keyspace, same actor: dedup ingests are hash-partitioned by
        # TEXT hash (h1 % P), not conv_id — the seen-set shards uniformly and
        # independently of conversation skew.
        self.dedup_buffer: dict[int, dict[str, pa.Table]] = {}
        if restore_epoch >= 0:
            # resolve through the persisted layout: a committed reshard's
            # FULL snapshot replaces the chain head at its epoch, so the
            # delta walk never crosses into pre-reshard routing
            layout = read_layout(self.sink.out_dir)
            self.store = SortedStateStore.restore_chain(
                lambda e: checkpoint_state_path(self.sink, layout, e,
                                                partition_id),
                restore_epoch, cfg.join_gap_us,
                dedup_ttl_us=cfg.dedup_ttl_us,
                cep_within_us=cfg.cep_within_us,
                max_open_rows_per_key=cfg.max_open_rows_per_key,
            )
        else:
            self.store = SortedStateStore()
        self._delta: dict[str, pd.DataFrame] = {}
        # Exact-mode (ttl=None) dedup seen-set index: (h1, h2) → ts high
        # mark.  Membership and mark advance are O(epoch delta) dict ops —
        # NOT an O(|seen|) frame re-merge per close, which would make close
        # time grow with every distinct text ever seen.  The store frame is
        # re-materialized from this dict only at full-snapshot epochs; delta
        # snapshots carry the epoch's touched rows, so the restore chain
        # reconstructs identical state either way.  TTL mode keeps the
        # frame-merge path (its seen-set is bounded by the ttl horizon).
        self._seen_index: dict[tuple[int, int], int] | None = None

    def ping(self) -> int:
        """Cheap readiness probe — the engine warms the pool right after
        creation so cold actor starts never stall the first epoch's routing
        tasks (blocked ray.get inside tasks + starting actors oversubscribes
        the node)."""
        return self.pid

    def ingest(self, epoch: int, table: pa.Table, source_key: str) -> int:
        """Idempotent ingestion.  ``source_key`` identifies the deterministic
        unit of routing work (the input file); a retried routing task re-sends
        the identical table under the same key and simply overwrites it —
        table-level dedup instead of a per-row drop_duplicates at close."""
        self.buffer.setdefault(epoch, {})[source_key] = table
        return table.num_rows

    def ingest_dedup(self, epoch: int, table: pa.Table, source_key: str) -> int:
        """Idempotent dedup-keyspace ingestion: (h1, h2, conv_id, turn_idx)
        rows whose text hash routes to this partition (same keyed-overwrite
        retry semantics as :meth:`ingest`)."""
        self.dedup_buffer.setdefault(epoch, {})[source_key] = table
        return table.num_rows

    def ingest_pair(self, epoch: int, fold: pa.Table | None,
                    ded: pa.Table | None, source_key: str) -> int:
        """Both keyspaces of one routed batch in ONE actor round-trip: the
        fold slice (conv partition) and the dedup slice (text-hash
        partition) ship together, halving per-batch ingest RPCs when the
        dedup stream is on.  Either side may be None (the batch had no rows
        for this partition in that keyspace); retry idempotence is the same
        keyed overwrite as the individual paths."""
        n = 0
        if fold is not None:
            n += self.ingest(epoch, fold, source_key)
        if ded is not None:
            n += self.ingest_dedup(epoch, ded, source_key)
        return n

    def retract(self, epoch: int, source_keys: list[str]) -> int:
        """Withdraw previously-ingested units of a file that failed MID-read:
        the route task buffers nothing locally (bounded memory), so
        all-or-nothing per-file semantics are restored by deleting the failed
        file's keyed tables from the epoch buffer before close folds them
        (reference: a failed file contributes nothing,
        watermark_processor.py:197-202)."""
        n = 0
        for buf in (self.buffer, self.dedup_buffer):
            bucket = buf.get(epoch)
            if bucket:
                for k in source_keys:
                    if bucket.pop(k, None) is not None:
                        n += 1
        return n

    # -- epoch close -------------------------------------------------------

    _EMPTY_BUF = pa.schema(
        [("conv_id", pa.string()), ("turn_idx", pa.int32()), ("role", pa.string()),
         ("tool", pa.string()), ("ts_us", pa.int64()), ("n_chars", pa.int64())]
    )

    def close_epoch(self, epoch: int, wm_prev_us: int, wm_after_us: int) -> dict:
        """Fold the epoch's buffered (narrow, already-late-filtered) rows into
        keyed state and emit the watermark-driven streams.  Turn and late
        emission happen at route time (they need the bulky text column, which
        never reaches the actors)."""
        t0 = time.monotonic()
        bucket = self.buffer.pop(epoch, {})
        tables = [t for _, t in sorted(bucket.items())]
        tbl = pa.concat_tables(tables) if tables else self._EMPTY_BUF.empty_table()
        tbl = tbl.select(_INGEST_COLS + (
            ["pbits"] if "pbits" in tbl.column_names else []))
        if tbl.num_rows:
            # ONE Arrow sort by (conv_id, ts, turn) for the whole close:
            # session premerge and any per-conv scan below rely on this
            # order, and Arrow's native string sort replaces what would
            # otherwise be repeated pandas object-lexsorts in the folds
            tbl = tbl.take(pc.sort_indices(tbl, sort_keys=[
                ("conv_id", "ascending"), ("ts_us", "ascending"),
                ("turn_idx", "ascending")]))
        live = tbl.to_pandas()
        self._delta = {}  # per-epoch join-buffer appends (delta snapshot)
        # flush close (wm → ∞): partition 0 writes even EMPTY emissions so
        # every enabled stream ends the run with >= 1 schema-bearing file
        # (consumers discover schemas by reading files; see _write)
        self._flush_close = wm_after_us >= INF_US
        on = self.cfg.stream_on  # per-stream enablement: skip the whole
        # fold+state+emit path of a disabled stream (emit_streams=None ⇒ all)
        emitted: dict[str, int] = {}
        # per-stream wall time inside this close (fold + emit), reported in
        # the close stats → committed marker: the stream-level cost signal
        # that locates a hot stream without an external A/B sweep
        stream_s: dict[str, float] = {}

        def timed(name, fn, *a):
            ts = time.monotonic()
            out = fn(*a)
            stream_s[name] = round(
                stream_s.get(name, 0.0) + time.monotonic() - ts, 4)
            return out

        if on("sessions"):
            timed("sessions", self._fold_sessions, live)
        if on("windows") or on("wstats"):
            # one fold feeds BOTH windows and wstats
            timed("windows", self._fold_wstats, live)
        if on("wdistinct") or on("wtopk"):
            # one fold feeds BOTH wdistinct and wtopk
            timed("wtools", self._fold_wtools, live)
        if self.cfg.wquant_ps is not None and on("wquant"):
            timed("wquant", self._fold_wquant, live)
        if on("sliding"):
            timed("sliding", self._fold_sliding, live)
        if on("matches"):
            timed("matches", self._fold_join, live)
        if on("timeouts"):
            timed("timeouts", self._fold_timeouts, live)
        t_fold = time.monotonic()

        # paired streams project from ONE state kind and emit together —
        # requesting either member turns the group (fold + both files) on
        if on("windows") or on("wstats"):
            emitted["windows"], emitted["wstats"] = \
                timed("windows", self._emit_tumbling, wm_after_us, epoch)
        if on("wdistinct") or on("wtopk"):
            emitted["wdistinct"], emitted["wtopk"] = \
                timed("wtools", self._emit_wtool_streams, wm_after_us, epoch)
        if self.cfg.wquant_ps is not None and on("wquant"):
            emitted["wquant"] = timed("wquant", self._emit_wquant,
                                      wm_after_us, epoch)
        if on("sessions"):
            emitted["sessions"] = timed("sessions", self._emit_sessions,
                                        wm_after_us, epoch)
        if on("sliding"):
            emitted["sliding"] = timed("sliding", self._emit_sliding,
                                       wm_after_us, epoch)
        if on("matches"):
            emitted["matches"] = timed("matches", self._emit_matches,
                                       wm_after_us, epoch)
        if on("timeouts"):
            emitted["timeouts"] = timed("timeouts", self._emit_timeouts,
                                        wm_after_us, epoch)
        if on("cep") or on("cepk") or self.cfg.cep_terms is not None:
            emitted["cep"], emitted["cepk"], n_cepp = \
                timed("cep", self._fold_emit_cep, live, wm_after_us, epoch)
            if self.cfg.cep_terms is not None:
                emitted["cepp"] = n_cepp
        if self.cfg.dedup_stream and on("dedup"):
            emitted["dedup"] = timed("dedup", self._emit_dedup,
                                     epoch, wm_after_us)
        t_emit = time.monotonic()
        # Per-key open-state bound (after emissions' watermark evictions,
        # before the snapshot, so checkpoints persist the CAPPED state and
        # a resumed run replays the identical trim) — dead-letter counts go
        # into the committed epoch marker, mirroring failed_files (ST2).
        capped = self.store.apply_key_cap(self.cfg.max_open_rows_per_key) \
            if self.cfg.max_open_rows_per_key is not None else {}
        mode = "full" if epoch % self.cfg.snapshot_full_every == 0 else "delta"
        if mode == "full":
            self._sync_seen_frame()  # exact-mode dedup index → store frame
        self.store.snapshot(self.sink.staging_state_path(epoch, self.pid),
                            mode=mode, delta=self._delta,
                            wm_after_us=wm_after_us)
        # per-partition event-time high mark → wm lag in metrics_df (the
        # north rule's per-partition lag signal; a partition whose max ts
        # trails the global watermark is skew-starved or behind)
        pmax = int(live["ts_us"].max()) if len(live) else None
        # exact-mode dedup keeps its live seen-set in the dict index; the
        # store frame only syncs at full snapshots — report the live count
        state_rows = int(self.store.total_rows())
        if self._seen_index is not None:
            state_rows += len(self._seen_index) - len(self.store.get("seen"))
        return {
            "partition": self.pid,
            "rows": int(len(tbl)),
            "state_rows": state_rows,
            "max_ts_us": pmax,
            "capped_rows": int(sum(capped.values())),
            "capped": {k: int(v) for k, v in capped.items()},
            "emitted": {k: int(v) for k, v in emitted.items()},
            "close_s": round(time.monotonic() - t0, 4),
            "fold_s": round(t_fold - t0, 4),
            "emit_s": round(t_emit - t_fold, 4),
            "snap_s": round(time.monotonic() - t_emit, 4),
            "stream_s": stream_s,
        }

    # -- folds (state updates) --------------------------------------------

    def _fold_sessions(self, live: pd.DataFrame) -> int:
        if len(live) == 0:
            return 0
        new = pd.DataFrame(
            {
                "conv_id": live["conv_id"].to_numpy(),
                "start_us": live["ts_us"].to_numpy(np.int64),
                "end_us": live["ts_us"].to_numpy(np.int64),
                "n": np.ones(len(live), dtype=np.int64),
            }
        )
        # live is (conv_id, ts)-sorted by the close prologue, which IS the
        # (conv_id, start, end) order of the single-point intervals: premerge
        # the epoch's rows sort-free, then merge the (small) premerged
        # intervals with the open-session state — gap-merge is associative,
        # so the two-step merge is exact and the big lexsort disappears
        pre = merge_session_intervals(new, self.cfg.session_spec.gap_us,
                                      presorted=True)
        merged = merge_session_intervals(
            pd.concat([self.store.get("sessions"), pre], ignore_index=True),
            self.cfg.session_spec.gap_us,
        )
        self.store.put("sessions", merged, presorted=True)
        return len(merged)

    def _fold_wstats(self, live: pd.DataFrame) -> int:
        """Per-(conv, tumbling window) VALUE aggregate of the turn text
        length: n / sum / min / max — all decomposable, so the open-window
        state folds by the same combine and stays one row per open window
        (the streaming counterpart of stages/windows.windowed_stats).  The
        count-window stream is the ``n`` projection of this state, so ONE
        fold and ONE eviction serve both output streams."""
        if len(live) == 0:
            return 0
        ws = self.cfg.tumbling_spec.assign(live["ts_us"].to_numpy(np.int64))
        c = live["n_chars"].to_numpy(np.int64)
        new = pd.DataFrame({"conv_id": live["conv_id"].to_numpy(),
                            "window_start_us": ws,
                            "n": np.ones(len(live), dtype=np.int64),
                            "sum_c": c, "min_c": c, "max_c": c})
        allw = pd.concat([self.store.get("wstats"), new], ignore_index=True)
        agg = allw.groupby(["conv_id", "window_start_us"], sort=False,
                           as_index=False).agg(
            n=("n", "sum"), sum_c=("sum_c", "sum"),
            min_c=("min_c", "min"), max_c=("max_c", "max"))
        self.store.put("wstats", agg)
        return len(agg)

    def _emit_tumbling(self, wm_us: int, epoch: int) -> tuple[int, int]:
        """Emit BOTH tumbling output streams from the shared wstats state
        (strict rule ``window_start + size <= wm``): the count-window stream
        is the ``n`` projection, the value-stats stream carries n/sum/min/max
        of the per-turn text length.  One state scan, one eviction."""
        w = self.store.get("wstats")
        size = self.cfg.tumbling_us
        done_mask = (w["window_start_us"].to_numpy(np.int64, copy=False) + size <= wm_us) \
            if len(w) else np.zeros(0, dtype=bool)
        done = w[done_mask]  # state is (conv_id, window_start_us)-sorted
        self.store.put("wstats", w[~done_mask], presorted=True)
        counts = pd.DataFrame(
            {"conv_id": done["conv_id"].to_numpy(),
             "window_start_us": done["window_start_us"].to_numpy(np.int64),
             "n_turns": done["n"].to_numpy(np.int64)})
        counts_schema = pa.schema([("conv_id", pa.string()),
                                   ("window_start_us", pa.int64()),
                                   ("n_turns", pa.int64())])
        n_windows = self._write("windows", epoch, counts, counts_schema)
        stats = pd.DataFrame(
            {"conv_id": done["conv_id"].to_numpy(),
             "window_start_us": done["window_start_us"].to_numpy(np.int64),
             "n_turns": done["n"].to_numpy(np.int64),
             "sum_chars": done["sum_c"].to_numpy(np.int64),
             "min_chars": done["min_c"].to_numpy(np.int64),
             "max_chars": done["max_c"].to_numpy(np.int64)})
        stats_schema = pa.schema([("conv_id", pa.string()),
                                  ("window_start_us", pa.int64()),
                                  ("n_turns", pa.int64()), ("sum_chars", pa.int64()),
                                  ("min_chars", pa.int64()), ("max_chars", pa.int64())])
        n_wstats = self._write("wstats", epoch, stats, stats_schema)
        return n_windows, n_wstats

    def _fold_wtools(self, live: pd.DataFrame) -> int:
        """Per-(conv, tumbling window, tool) COUNT state — the decomposable
        groupby-sum fold is order-free, and state stays one row per distinct
        (conv, window, tool) regardless of turn volume.  TWO output streams
        project from this kind at emission: windowed COUNT DISTINCT (row
        count per window) and windowed top-k tools (count order)."""
        t = live[live["role"] == "tool"]
        if len(t) == 0:
            return 0
        ws = self.cfg.tumbling_spec.assign(t["ts_us"].to_numpy(np.int64))
        new = pd.DataFrame({"conv_id": t["conv_id"].to_numpy(),
                            "window_start_us": ws,
                            "tool": t["tool"].to_numpy(),
                            "n": np.ones(len(t), dtype=np.int64)})
        allw = pd.concat([self.store.get("wtools"), new], ignore_index=True)
        self.store.put("wtools", allw.groupby(
            ["conv_id", "window_start_us", "tool"], sort=False,
            as_index=False)["n"].sum())
        return len(new)

    def _emit_wtool_streams(self, wm_us: int, epoch: int) -> tuple[int, int]:
        """Emit BOTH tool-keyed window streams from one state scan + one
        eviction (strict rule ``window_start + size <= wm``): ``wdistinct``
        (n_tools per closed window) and ``wtopk`` (the cfg.wtopk_k most
        frequent tools per closed window, ties broken by tool name — fully
        deterministic).  Only windows with >= 1 tool-role turn appear."""
        w = self.store.get("wtools")
        size = self.cfg.tumbling_us
        done_mask = (w["window_start_us"].to_numpy(np.int64, copy=False)
                     + size <= wm_us) if len(w) else np.zeros(0, dtype=bool)
        done = w[done_mask]
        self.store.put("wtools", w[~done_mask], presorted=True)
        out = done.groupby(["conv_id", "window_start_us"], sort=False) \
            .size().reset_index(name="n_tools")
        # first-occurrence group order of a (conv, window, tool)-sorted frame
        # IS (conv, window) order: no re-sort
        out["n_tools"] = out["n_tools"].astype(np.int64) if len(out) else \
            pd.Series([], dtype=np.int64)
        schema = pa.schema([("conv_id", pa.string()),
                            ("window_start_us", pa.int64()),
                            ("n_tools", pa.int64())])
        n_wdistinct = self._write("wdistinct", epoch, out, schema)

        topk = wtopk_project(done, self.cfg.wtopk_k)
        topk_schema = pa.schema([("conv_id", pa.string()),
                                 ("window_start_us", pa.int64()),
                                 ("tool", pa.string()), ("n", pa.int64()),
                                 ("rank", pa.int64())])
        n_wtopk = self._write("wtopk", epoch, topk, topk_schema)
        return n_wdistinct, n_wtopk

    _SLIDING_BOUND_KEY = "sliding_emit_bound"


    def _fold_wquant(self, live: pd.DataFrame) -> int:
        """Windowed-percentile state: per-(conv, tumbling window,
        length-value) counts.  Exact quantiles are not decomposable from
        scalar aggregates, but the VALUE DOMAIN (post-scrub text length) is
        discrete, so per-value counts fold by groupby-sum exactly like the
        wtools state — bounded by open windows x distinct lengths."""
        if len(live) == 0:
            return 0
        ws = self.cfg.tumbling_spec.assign(live["ts_us"].to_numpy(np.int64))
        new = pd.DataFrame({"conv_id": live["conv_id"].to_numpy(),
                            "window_start_us": ws,
                            "val": live["n_chars"].to_numpy(np.int64),
                            "n": np.ones(len(live), dtype=np.int64)})
        alln = pd.concat([self.store.get("wquant"), new], ignore_index=True)
        agg = alln.groupby(["conv_id", "window_start_us", "val"], sort=False,
                           as_index=False)["n"].sum()
        self.store.put("wquant", agg)
        return len(agg)

    def _emit_wquant(self, wm_us: int, epoch: int) -> int:
        """Emit nearest-rank percentiles per closed window (strict rule
        ``window_start + size <= wm``): with the state value-sorted per
        window, percentile p is the first value whose running count reaches
        ``ceil(n * p / 100)`` — integer arithmetic, so the engine and the
        single-process oracle compute the identical rank target."""
        ps = self.cfg.wquant_ps
        w = self.store.get("wquant")
        size = self.cfg.tumbling_us
        done_mask = (w["window_start_us"].to_numpy(np.int64, copy=False)
                     + size <= wm_us) if len(w) else np.zeros(0, dtype=bool)
        done = w[done_mask]  # state is (conv, window, val)-sorted
        self.store.put("wquant", w[~done_mask], presorted=True)
        fields = [("conv_id", pa.string()), ("window_start_us", pa.int64()),
                  ("n_turns", pa.int64())] +             [(f"p{p}_chars", pa.int64()) for p in ps]
        schema = pa.schema(fields)
        if not len(done):
            out = pd.DataFrame({f.name: pd.Series(
                [], dtype=str if f.name == "conv_id" else np.int64)
                for f in schema})
            return self._write("wquant", epoch, out, schema)
        grp = done.groupby(["conv_id", "window_start_us"], sort=False)
        tot = grp["n"].transform("sum").to_numpy(np.int64)
        cum = grp["n"].cumsum().to_numpy(np.int64)
        base = done.drop_duplicates(["conv_id", "window_start_us"])
        out = pd.DataFrame({
            "conv_id": base["conv_id"].to_numpy(),
            "window_start_us": base["window_start_us"].to_numpy(np.int64),
            "n_turns": tot[~done.duplicated(
                ["conv_id", "window_start_us"]).to_numpy()]})
        for p in ps:
            target = (tot * p + 99) // 100  # ceil(n*p/100), integer-exact
            sel = done[cum >= target].drop_duplicates(
                ["conv_id", "window_start_us"])
            # every group hits (1 <= target <= tot), in base's sorted order
            assert len(sel) == len(out)
            out[f"p{p}_chars"] = sel["val"].to_numpy(np.int64)
        return self._write("wquant", epoch, out, schema)

    def _fold_sliding(self, live: pd.DataFrame) -> int:
        """Sliding windows via gcd-bucket pre-aggregation: the fold only
        counts per (conv, gcd(size, slide) bucket) — NO per-turn window
        expansion; buckets roll up into overlapping windows once, at
        emission.  gcd buckets (not slide buckets) make the rollup exact for
        NON-divisible size/slide too: every window boundary is a bucket
        boundary, so a bucket is entirely inside or outside each window.
        Same final (conv, window, count) multiset as
        stages/windows.sliding_counts for any config."""
        if len(live) == 0:
            return 0
        b = self.cfg.sliding_spec.assign_bucket(live["ts_us"].to_numpy(np.int64))
        new = pd.DataFrame({"conv_id": live["conv_id"].to_numpy(),
                            "window_start_us": b,
                            "n": np.ones(len(live), dtype=np.int64)})
        alls = pd.concat([self.store.get("sliding"), new], ignore_index=True)
        agg = alls.groupby(["conv_id", "window_start_us"], sort=False,
                           as_index=False)["n"].sum()
        self.store.put("sliding", agg)
        return len(agg)

    def _emit_sliding(self, wm_us: int, epoch: int) -> int:
        """Emit every window ws with ``prev_bound < ws <= wm - size`` by
        expanding only the buckets that feed that range (each gcd-bucket
        feeds at most ``n_windows_per_bucket()`` windows over its whole
        lifetime).  The emission bound is persisted in the "meta" state so
        replays emit identical rows."""
        spec = self.cfg.sliding_spec
        size, slide, g = spec.size_us, spec.slide_us, spec.bucket_us
        meta = self.store.get("meta")
        prev = meta[meta["conv_id"] == self._SLIDING_BOUND_KEY]
        prev_bound = int(prev["n"].iloc[0]) if len(prev) else -(1 << 62)
        bound = min(wm_us - size, (1 << 61))  # clamp the flush-epoch ∞
        schema = pa.schema([("conv_id", pa.string()), ("window_start_us", pa.int64()),
                            ("n_turns", pa.int64())])
        if bound <= prev_bound:
            return self._write("sliding", epoch, pd.DataFrame(
                {"conv_id": pd.Series([], dtype=str),
                 "window_start_us": pd.Series([], dtype=np.int64),
                 "n_turns": pd.Series([], dtype=np.int64)}), schema)
        w = self.store.get("sliding")
        bk = w["window_start_us"].to_numpy(np.int64, copy=False) if len(w) else \
            np.zeros(0, dtype=np.int64)
        # window ws covers bucket b iff ws <= b <= ws + size - g, so buckets
        # feeding any window in (prev_bound, bound]: b ∈ (prev_bound, bound+size-g]
        feed_mask = (bk > prev_bound) & (bk <= bound + size - g)
        feed = w[feed_mask]
        n_off = spec.n_windows_per_bucket()
        if len(feed):
            fb = feed["window_start_us"].to_numpy(np.int64)
            # candidate windows of bucket b: slide multiples descending from
            # floor(b/slide)*slide, clipped to ws >= b + g - size
            top = (fb // slide) * slide
            ws = (top[:, None] - np.arange(n_off, dtype=np.int64)[None, :] * slide).ravel()
            conv = np.repeat(feed["conv_id"].to_numpy(), n_off)
            n = np.repeat(feed["n"].to_numpy(np.int64), n_off)
            fbr = np.repeat(fb, n_off)
            keep = (ws > prev_bound) & (ws <= bound) & (ws >= fbr + g - size)
            out = (
                pd.DataFrame({"conv_id": conv[keep], "window_start_us": ws[keep],
                              "n": n[keep]})
                .groupby(["conv_id", "window_start_us"], sort=False, as_index=False)["n"]
                .sum()
                .rename(columns={"n": "n_turns"})
                .sort_values(["conv_id", "window_start_us"], kind="mergesort")
            )
        else:
            out = pd.DataFrame({"conv_id": pd.Series([], dtype=str),
                                "window_start_us": pd.Series([], dtype=np.int64),
                                "n_turns": pd.Series([], dtype=np.int64)})
        # evict buckets whose LAST window (ws = floor(b/slide)*slide) is
        # now emitted; retained buckets have top(b) > bound >= prev_bound,
        # so no retained bucket ever falls below a future feed range
        self.store.put("sliding", w[(bk // slide) * slide > bound] if len(w)
                       else w, presorted=True)
        self.store.put("meta", pd.DataFrame(
            {"conv_id": [self._SLIDING_BOUND_KEY], "n": np.array([bound], np.int64)}))
        return self._write("sliding", epoch, out, schema)

    def _fold_emit_cep(self, live: pd.DataFrame, wm_us: int,
                       epoch: int) -> tuple[int, int]:
        """Streaming CEP: up to THREE pattern streams from ONE shared
        open-turn buffer — ``cep`` (contiguous role sequence,
        StreamConfig.cep_pattern), ``cepk`` (Kleene-plus ``user (tool)+
        assistant``) and, when ``cep_terms`` is configured, ``cepp``
        (per-slot predicated sequence; predicate bits evaluated at route
        time and packed into the high bits of the buffered role code) —
        each match emitted in the epoch its LAST constituent turn arrives.

        Completion-driven, not watermark-driven: a match over consecutive
        turn_idx values is decided the moment all its turns are present
        (turn indices are unique per conversation, so no future arrival can
        contradict it — for Kleene, the bracketing user/assistant turns fix
        the run's extent, so maximality is decided the same way), and the
        completion epoch is a pure function of input + epoch slicing —
        deterministic under kill/resume.  Exactly-once without an
        emitted-match set: a match is reported iff ≥ 1 of its turns is NEW
        this epoch, which is true precisely once.

        Eviction is watermark-driven: a buffered turn with ``ts < wm −
        within`` is dropped because any future (non-late) arrival has ``ts ≥
        wm``, making every not-yet-complete match through the dropped turn
        exceed the span bound ``max(ts) − min(ts) ≤ within`` (the span rule —
        NOT endpoint difference — is what makes this sound when late-but-
        accepted rows break ts-monotonicity in turn_idx)."""
        from ..config import ROLE_CODES
        from ..stages.cep import kleene_scan, masked_sequence_scan, sequence_scan

        pat = self.cfg.cep_codes
        has_p = self.cfg.cep_terms is not None
        old = self.store.get("cepbuf")
        if len(live):
            code = np.full(len(live), -1, dtype=np.int64)
            role = live["role"].to_numpy()
            for r, c in ROLE_CODES.items():
                code[role == r] = c
            if has_p:
                # predicate bits (evaluated once at route time, where the
                # text column exists) ride the high bits of "n" — no state
                # schema change, delta snapshots / restore untouched.
                # (& 0xFF first: the unknown-role sentinel -1 is all ones
                # and would otherwise bleed into the predicate bits)
                code = (code & 0xFF) | (live["pbits"].to_numpy(np.int64) << 8)
            new = pd.DataFrame({"conv_id": live["conv_id"].to_numpy(),
                                "turn_idx": live["turn_idx"].to_numpy(np.int32),
                                "n": code,
                                "ts_us": live["ts_us"].to_numpy(np.int64)})
        else:
            new = old.iloc[0:0]
        self._delta["cepbuf"] = new
        buf = merge_sorted_append(
            old.assign(_new=False),
            new.assign(_new=True).sort_values(["conv_id", "turn_idx"],
                                              kind="mergesort"),
            ["conv_id", "turn_idx"])
        conv = buf["conv_id"].to_numpy()
        codes_raw = buf["n"].to_numpy(np.int64)
        codes = codes_raw & 0xFF  # low byte = role code, high bits = pbits
        tix = buf["turn_idx"].to_numpy().astype(np.int64)
        ts = buf["ts_us"].to_numpy(np.int64)
        isnew = buf["_new"].to_numpy(bool)

        # -- fixed-sequence stream ("cep"): shared scan; isnew implements
        # the completed-THIS-epoch ⇒ emitted-exactly-once rule
        idx, dt = sequence_scan(conv, codes, tix, ts, pat,
                                self.cfg.cep_within_us, isnew=isnew)
        # scan emits in buf order = (conv_id, turn_idx) order: no re-sort
        out = pd.DataFrame({
            "conv_id": conv[idx] if len(idx) else pd.Series([], dtype=str),
            "turn_idx": tix[idx].astype(np.int32),
            "dt_us": dt,
        })
        schema = pa.schema([("conv_id", pa.string()), ("turn_idx", pa.int32()),
                            ("dt_us", pa.int64())])
        n_cep = self._write("cep", epoch, out, schema)

        # -- Kleene-plus stream ("cepk"): same buffer, shared scan with the
        # batch operator; completion test = any new turn in user..assistant
        # (prefix-sum range query over the new flags)
        sp, s, e, en, dtk = kleene_scan(
            conv, codes, tix, ts, self.cfg.cep_within_us,
            user=ROLE_CODES["user"], tool=ROLE_CODES["tool"],
            assistant=ROLE_CODES["assistant"])
        outk = pd.DataFrame({"conv_id": pd.Series([], dtype=str),
                             "turn_idx": pd.Series([], dtype=np.int32),
                             "n_tools": pd.Series([], dtype=np.int64),
                             "dt_us": pd.Series([], dtype=np.int64)})
        if len(sp):
            pnew = np.concatenate([[0], np.cumsum(isnew.astype(np.int64))])
            anynewk = (pnew[en + 1] - pnew[sp]) > 0
            idx = np.flatnonzero(anynewk)
            if len(idx):
                outk = pd.DataFrame({  # ascending positions: presorted
                    "conv_id": conv[s[idx]],
                    "turn_idx": tix[sp[idx]].astype(np.int32),
                    "n_tools": (e[idx] - s[idx] + 1).astype(np.int64),
                    "dt_us": dtk[idx],
                })
        schema_k = pa.schema([("conv_id", pa.string()), ("turn_idx", pa.int32()),
                              ("n_tools", pa.int64()), ("dt_us", pa.int64())])
        n_cepk = self._write("cepk", epoch, outk, schema_k)

        # -- predicated stream ("cepp"): the DEFINE-clause generalization —
        # same buffer, same completion/eviction rules, masks unpacked from
        # the route-time predicate bits (no text in state, ever)
        n_cepp = 0
        if has_p:
            masks = [((codes_raw >> (8 + j)) & 1).astype(bool)
                     for j in range(len(self.cfg.cep_terms))]
            idxp, dtp = masked_sequence_scan(conv, tix, ts, masks,
                                             self.cfg.cep_within_us,
                                             isnew=isnew)
            outp = pd.DataFrame({  # scan order = (conv, turn_idx) order
                "conv_id": conv[idxp] if len(idxp) else pd.Series([], dtype=str),
                "turn_idx": tix[idxp].astype(np.int32),
                "dt_us": dtp,
            })
            n_cepp = self._write("cepp", epoch, outp, schema)

        keep = ts >= wm_us - self.cfg.cep_within_us
        self.store.put("cepbuf", buf[keep].drop(columns=["_new"]),
                       presorted=True)  # buf is (conv_id, turn_idx)-sorted
        return n_cep, n_cepk, n_cepp

    def _fold_join(self, live: pd.DataFrame) -> None:
        if len(live) == 0:
            return
        u = live[live["role"] == "user"]
        t = live[live["role"] == "tool"]
        if len(u):
            nu = pd.DataFrame({"conv_id": u["conv_id"].to_numpy(),
                               "ts_us": u["ts_us"].to_numpy(np.int64),
                               "turn_idx": u["turn_idx"].to_numpy(np.int32)})
            self._delta["users"] = nu
            # live is (conv, ts, turn)-sorted, so nu is presorted: O(n+m log n)
            # run merge instead of re-lexsorting the whole join buffer
            self.store.put("users", merge_sorted_append(
                self.store.get("users"), nu, ["conv_id", "ts_us", "turn_idx"]),
                presorted=True)
        if len(t):
            nt = pd.DataFrame({"conv_id": t["conv_id"].to_numpy(),
                               "ts_us": t["ts_us"].to_numpy(np.int64),
                               "turn_idx": t["turn_idx"].to_numpy(np.int32),
                               "tool": t["tool"].to_numpy()})
            self._delta["tools"] = nt
            self.store.put("tools", merge_sorted_append(
                self.store.get("tools"), nt, ["conv_id", "ts_us", "turn_idx"]),
                presorted=True)

    def _fold_timeouts(self, live: pd.DataFrame) -> None:
        """CEP negation state: new "user" turns become pending triggers; new
        "assistant" turns append to the reply-time buffer.  Clearing and
        firing both happen at close (:meth:`_emit_timeouts`), so the fold is
        a pure append — retry-idempotent like every other fold (the epoch
        buffer dedups by source key before this runs)."""
        if len(live) == 0:
            return
        u = live[live["role"] == "user"]
        if len(u):
            np_ = pd.DataFrame({"conv_id": u["conv_id"].to_numpy(),
                                "turn_idx": u["turn_idx"].to_numpy(np.int32),
                                "ts_us": u["ts_us"].to_numpy(np.int64)})
            self.store.put("pend", merge_sorted_append(
                self.store.get("pend"), np_, ["conv_id", "ts_us", "turn_idx"]),
                presorted=True)
        a = live[live["role"] == "assistant"]
        if len(a):
            na = pd.DataFrame({"conv_id": a["conv_id"].to_numpy(),
                               "ts_us": a["ts_us"].to_numpy(np.int64)})
            self.store.put("arep", merge_sorted_append(
                self.store.get("arep"), na, ["conv_id", "ts_us"]),
                presorted=True)

    # -- emissions ---------------------------------------------------------

    def _write(self, stream: str, epoch: int, df, schema: pa.Schema) -> int:
        """Stage one stream's epoch emission (``df``: DataFrame or Arrow
        Table already matching ``schema``)."""
        if len(df) == 0 and not (getattr(self, "_flush_close", False)
                                 and self.pid == 0):
            # no file for an empty emission: at 10^12-turn scale an
            # unconditional write is partitions x streams x epochs EMPTY
            # parquet files (millions) polluting the output tree and every
            # consumer's file listing.  Committed markers still carry the
            # zero count; readers glob whatever files exist.  Exception:
            # partition 0 of the FLUSH epoch writes even empty frames so a
            # stream that never fired still leaves one schema-bearing file.
            return 0
        path = self.sink.staging_path(epoch, stream, self.pid)
        tbl = df.cast(schema) if isinstance(df, pa.Table) else \
            pa.Table.from_pandas(df, schema=schema, preserve_index=False)
        pq.write_table(tbl, path)
        return len(df)

    def _seen_idx(self) -> dict[tuple[int, int], int]:
        """Lazy-build the exact-mode seen index from the store frame (cold
        start: empty; after restore: the chain's groupby-maxed marks) —
        O(|seen|) ONCE per actor lifetime, then O(delta) per epoch."""
        if self._seen_index is None:
            seen = self.store.get("seen")
            self._seen_index = {
                (int(a), int(b)): int(t)
                for a, b, t in zip(seen["h1"].to_numpy(np.int64),
                                   seen["h2"].to_numpy(np.int64),
                                   seen["ts_us"].to_numpy(np.int64))}
        return self._seen_index

    def _sync_seen_frame(self) -> None:
        """Materialize the exact-mode dict index back into the store frame —
        called ONLY before a full snapshot (cost amortized over the delta
        chain), so full snapshots always serialize the complete seen-set."""
        if self._seen_index is None:
            return
        idx = self._seen_index
        if len(idx):
            ks = np.array(list(idx.keys()), dtype=np.int64)
            self.store.put("seen", pd.DataFrame({
                "h1": ks[:, 0], "h2": ks[:, 1],
                "ts_us": np.fromiter(idx.values(), dtype=np.int64,
                                     count=len(idx))}))
        # empty dict: frame is already empty (nothing was ever inserted)

    def _emit_dedup(self, epoch: int, wm_after_us: int) -> int:
        """Streaming dedup: emit the winner row of every text hash not in the
        seen-set (not watermark-driven — first sight is final).

        Winner rule is ARRIVAL-ORDER-FREE so parallel routing can't make it
        nondeterministic: within the first epoch containing a hash, the
        winner is the min ``(conv_id, turn_idx)`` occurrence.  The seen-set
        keeps each hash's event-time HIGH MARK: exact mode (ttl=None) never
        evicts — O(distinct texts) per partition, horizontally sharded by
        text hash, maintained INCREMENTALLY (dict index, O(epoch delta) per
        close — see ``_seen_idx``); TTL mode forgets hashes unseen for ``dedup_ttl_us`` of
        event time at each close (their next occurrence re-emits), bounding
        state to one dedup horizon.  Delta snapshots carry the epoch's new /
        ts-advanced rows; restore groupby-maxes the chain (exact because
        ttl >= lateness, enforced in StreamConfig)."""
        bucket = self.dedup_buffer.pop(epoch, {})
        tables = [t for _, t in sorted(bucket.items())]
        schema = pa.schema([("conv_id", pa.string()), ("turn_idx", pa.int32()),
                            ("h1", pa.int64()), ("h2", pa.int64()),
                            ("ts_us", pa.int64())])
        tbl = pa.concat_tables(tables) if tables else schema.empty_table()
        if tbl.num_rows:
            # sort in ARROW: pandas lexsort over the object conv_id column
            # is the single slowest piece of this emit (measured ~2x the
            # rest); Arrow's string sort works off the native buffers
            tbl = tbl.take(pc.sort_indices(tbl, sort_keys=[
                ("h1", "ascending"), ("h2", "ascending"),
                ("conv_id", "ascending"), ("turn_idx", "ascending")]))
        df = tbl.to_pandas()
        ttl = self.cfg.dedup_ttl_us
        if len(df):
            # per-hash epoch rollup (frame already (h1, h2, conv, turn)-
            # sorted): winner = first row per hash; ts high mark = max
            mx = df.groupby(["h1", "h2"], sort=False, as_index=False)["ts_us"].max()
            df = df.drop_duplicates(["h1", "h2"])
            # the delta carries every hash touched this epoch so a restored
            # chain reconstructs the identical marks
            self._delta["seen"] = mx
            if ttl is None:
                # exact mode: incremental dict index — membership test plus
                # mark advance cost O(epoch delta), independent of |seen|
                idx = self._seen_idx()
                h1s = mx["h1"].to_numpy(np.int64)
                h2s = mx["h2"].to_numpy(np.int64)
                tss = mx["ts_us"].to_numpy(np.int64)
                fresh = np.empty(len(mx), dtype=bool)
                for i in range(len(mx)):
                    k = (int(h1s[i]), int(h2s[i]))
                    prev = idx.get(k)
                    fresh[i] = prev is None
                    if prev is None or tss[i] > prev:
                        idx[k] = int(tss[i])
                # mx and df share (h1,h2) order (both derive from the same
                # sorted frame), so the fresh mask aligns positionally
                df = df[fresh]
            else:
                seen = self.store.get("seen")
                if len(seen):
                    m = df.merge(seen[["h1", "h2"]], on=["h1", "h2"],
                                 how="left", indicator=True)
                    df = m[m["_merge"] == "left_only"].drop(columns=["_merge"])
                # advance high marks (new hashes insert, re-seen max up)
                merged = pd.concat([seen, mx], ignore_index=True)
                merged = merged.groupby(["h1", "h2"], sort=False,
                                        as_index=False)["ts_us"].max()
                self.store.put("seen", merged)
        if ttl is not None:
            # evict EVERY close (even with no dedup rows this epoch) — the
            # restore path applies this threshold unconditionally, so the
            # live store must too or a resumed run would diverge
            seen = self.store.get("seen")
            if len(seen):
                self.store.put("seen",
                               seen[seen["ts_us"] >= wm_after_us - ttl])
        out_schema = pa.schema([("conv_id", pa.string()),
                                ("turn_idx", pa.int32())])
        if len(df):
            ot = pa.table({"conv_id": pa.array(df["conv_id"].to_numpy(),
                                               pa.string()),
                           "turn_idx": pa.array(df["turn_idx"].to_numpy(),
                                                pa.int32())})
            out = ot.take(pc.sort_indices(ot, sort_keys=[
                ("conv_id", "ascending"), ("turn_idx", "ascending")]))
        else:
            out = out_schema.empty_table()
        return self._write("dedup", epoch, out, out_schema)

    _TIMEOUT_SCHEMA = pa.schema([("conv_id", pa.string()),
                                 ("turn_idx", pa.int32()),
                                 ("deadline_us", pa.int64())])

    def _emit_timeouts(self, wm_us: int, epoch: int) -> int:
        """Fire the CEP-negation timeouts the watermark has sealed.

        Clear first: a pending trigger with ANY buffered expected-turn ts in
        ``[trigger, trigger + within]`` is satisfied and silently dropped
        (vectorized forward merge_asof, the batch matcher's kernel).  Then
        fire: survivors whose ``deadline = ts + within`` lies strictly below
        the watermark can never be cleared anymore — a clearing turn would
        have ts ≤ deadline < wm and be late-dropped at route time — so
        emission is exactly-once and arrival-order-free.  Reply buffer
        evicts below the watermark (a future trigger's ts is ≥ wm, so its
        window can only need replies with ts ≥ wm)."""
        within = self.cfg.timeout_within_us
        pend = self.store.get("pend")
        arep = self.store.get("arep")
        out = pd.DataFrame({"conv_id": pd.Series([], dtype=str),
                            "turn_idx": pd.Series([], dtype=np.int32),
                            "deadline_us": pd.Series([], dtype=np.int64)})
        if len(pend):
            if len(arep):
                lu = pend.sort_values("ts_us", kind="mergesort")
                ra = arep.sort_values("ts_us", kind="mergesort") \
                    .rename(columns={"ts_us": "a_ts_us"})
                m = pd.merge_asof(lu, ra, left_on="ts_us",
                                  right_on="a_ts_us", by="conv_id",
                                  direction="forward")
                cleared = m["a_ts_us"].notna().to_numpy() \
                    & (m["a_ts_us"].to_numpy() - m["ts_us"].to_numpy()
                       <= within)
                pend = m.loc[~cleared, ["conv_id", "turn_idx", "ts_us"]]
            fire = pend["ts_us"].to_numpy(np.int64) + within < wm_us
            fired = pend[fire]
            self.store.put("pend", pend[~fire])
            out = pd.DataFrame({
                "conv_id": fired["conv_id"].to_numpy(),
                "turn_idx": fired["turn_idx"].to_numpy(np.int32),
                "deadline_us": fired["ts_us"].to_numpy(np.int64) + within,
            }).sort_values(["conv_id", "turn_idx"], kind="mergesort")
        if len(arep):
            self.store.put("arep", arep[arep["ts_us"].to_numpy(np.int64)
                                        >= wm_us], presorted=True)
        return self._write("timeouts", epoch, out, self._TIMEOUT_SCHEMA)

    def _emit_sessions(self, wm_us: int, epoch: int) -> int:
        s = self.store.get("sessions")
        closed_mask = s["end_us"].to_numpy(np.int64, copy=False) < wm_us - self.cfg.session_gap_us \
            if len(s) else np.zeros(0, dtype=bool)
        closed = s[closed_mask]
        self.store.put("sessions", s[~closed_mask], presorted=True)
        out = pd.DataFrame(  # closed keeps the (conv, start) state order
            {"conv_id": closed["conv_id"].to_numpy(),
             "session_start_us": closed["start_us"].to_numpy(np.int64),
             "session_end_us": closed["end_us"].to_numpy(np.int64),
             "n_turns": closed["n"].to_numpy(np.int64)}
        )
        schema = pa.schema([("conv_id", pa.string()), ("session_start_us", pa.int64()),
                            ("session_end_us", pa.int64()), ("n_turns", pa.int64())])
        return self._write("sessions", epoch, out, schema)

    def _emit_matches(self, wm_us: int, epoch: int) -> int:
        users = self.store.get("users")
        tools = self.store.get("tools")
        gap = self.cfg.join_gap_us
        fire_mask = tools["ts_us"].to_numpy(np.int64, copy=False) < wm_us \
            if len(tools) else np.zeros(0, dtype=bool)
        fire = tools[fire_mask]
        self.store.put("tools", tools[~fire_mask], presorted=True)
        schema = pa.schema([("conv_id", pa.string()), ("user_turn_idx", pa.int32()),
                            ("tool_turn_idx", pa.int32()), ("tool", pa.string()),
                            ("dt_us", pa.int64())])
        if len(fire) == 0 or len(users) == 0:
            out = pd.DataFrame({"conv_id": pd.Series([], dtype=str),
                                "user_turn_idx": pd.Series([], dtype=np.int32),
                                "tool_turn_idx": pd.Series([], dtype=np.int32),
                                "tool": pd.Series([], dtype=str),
                                "dt_us": pd.Series([], dtype=np.int64)})
            n = self._write("matches", epoch, out, schema)
        else:
            u = users.sort_values(["ts_us", "turn_idx"], kind="mergesort").rename(
                columns={"turn_idx": "user_turn_idx"})
            t = fire.sort_values(["ts_us", "turn_idx"], kind="mergesort").rename(
                columns={"turn_idx": "tool_turn_idx"})
            m = pd.merge_asof(t, u, on="ts_us", by="conv_id", direction="backward",
                              tolerance=gap, suffixes=("", "_u"))
            matched = m.dropna(subset=["user_turn_idx"])
            uts = u.rename(columns={"ts_us": "user_ts_us"})
            matched = matched.merge(uts, on=["conv_id", "user_turn_idx"], how="left")
            out = pd.DataFrame(
                {"conv_id": matched["conv_id"].to_numpy(),
                 "user_turn_idx": matched["user_turn_idx"].astype(np.int32).to_numpy(),
                 "tool_turn_idx": matched["tool_turn_idx"].astype(np.int32).to_numpy(),
                 "tool": matched["tool"].to_numpy(),
                 "dt_us": (matched["ts_us"].to_numpy(np.int64)
                           - matched["user_ts_us"].to_numpy(np.int64))}
            ).sort_values(["conv_id", "tool_turn_idx"], kind="mergesort")
            n = self._write("matches", epoch, out, schema)
        # Evict user turns no future tool can match (tool.ts ≥ wm, dt ≤ gap).
        if len(users):
            keep = users["ts_us"].to_numpy(np.int64, copy=False) >= wm_us - gap
            self.store.put("users", users[keep], presorted=True)
        return n


@ray.remote(num_cpus=0)
class ProgressTracker:
    """Advisory LIVE progress for the running epoch — the engine's answer to
    the reference's intra-file progress counter updated per page
    (``watermark_processor.py:162-163``), complementing the post-hoc
    ``metrics_df`` built from committed markers.

    Route tasks send fire-and-forget per-batch updates, so counts are
    at-least-once under task retries and may briefly trail the actual work:
    purely observational — the committed epoch markers stay the single
    source of truth for exactly-once accounting."""

    def __init__(self) -> None:
        self.epochs: dict[int, dict[str, int]] = {}

    def add(self, epoch: int, rows: int, batches: int = 1, files: int = 0) -> None:
        c = self.epochs.setdefault(epoch, {"rows": 0, "batches": 0, "files": 0})
        c["rows"] += rows
        c["batches"] += batches
        c["files"] += files

    def snapshot(self) -> dict:
        return {e: dict(c) for e, c in self.epochs.items()}


def _prepare_table(t: pa.Table, scrub_fn, num_partitions: int,
                   hot_keys: tuple[str, ...] = (),
                   cep_terms: tuple | None = None) -> pa.Table:
    """scrub + ts_us + n_chars + partition columns (shared routing prep).

    ``n_chars`` (post-scrub text length) is the per-turn VALUE the windowed
    stats aggregate — computed here so the bulky text column itself still
    never ships to the state actors.  With ``cep_terms`` (predicated
    streaming CEP), each row's per-term satisfaction bits are ALSO evaluated
    here — the only point where the text column exists — and packed into one
    ``pbits`` uint8 (bit j = row satisfies term j), so the predicate ships
    as one byte per row and the regexes never run inside the actors."""
    t = scrub_fn(t)
    t = t.append_column("ts_us", t["ts"].cast(pa.int64()))
    n_chars = pc.fill_null(pc.utf8_length(t["text"]), 0).cast(pa.int64())
    t = t.append_column("n_chars", n_chars)
    if cep_terms is not None:
        from ..stages.cep import term_mask

        pdf_ = t.select(["role", "tool", "text"]).to_pandas()
        pb = np.zeros(len(pdf_), np.uint8)
        for j, term in enumerate(cep_terms):
            pb |= term_mask(pdf_, term).astype(np.uint8) << np.uint8(j)
        t = t.append_column("pbits", pa.array(pb))
    part = partition_table(t, "conv_id", num_partitions, hot_keys=hot_keys)
    return t.append_column("part", pa.array(part))


# Only the narrow fold columns reach the state actors — the text column (the
# bulk of every row) is emitted at route time and never crosses the object
# store twice.
_INGEST_COLS = ["conv_id", "turn_idx", "role", "tool", "ts_us", "n_chars"]


def _route_table(t: pa.Table, actors, epoch: int,
                 source_key: str | None = None, wait: bool = True) -> list:
    """Partition one prepared (narrow) table and push slices to the state
    actors.  One gather, then zero-copy range slices.  With ``wait=False``
    returns the ack refs so the caller can overlap a second keyed route
    (dedup) and block on both at once."""
    part = t["part"].to_numpy(zero_copy_only=False)
    order = np.argsort(part, kind="stable")
    cols = _INGEST_COLS + (["pbits"] if "pbits" in t.column_names else [])
    sub = t.select(cols).take(pa.array(order))
    sorted_part = part[order]
    bounds = np.searchsorted(sorted_part, np.arange(len(actors) + 1))
    acks = []
    for p in range(len(actors)):
        lo, hi = int(bounds[p]), int(bounds[p + 1])
        if hi > lo:
            acks.append(actors[p].ingest.options(concurrency_group="ingest")
                        .remote(epoch, sub.slice(lo, hi - lo), source_key))
    if wait:
        ray.get(acks)  # backpressure: done only once state holds the rows
    return acks


_HASH_MASK = np.int64((1 << 52) - 1)  # 52-bit halves: exact through the
#                                       snapshot's int64-as-float round-trip


def _dedup_hashes(texts) -> tuple[np.ndarray, np.ndarray]:
    """Two independent 52-bit text hashes (104-bit composite; collisions
    effectively impossible, so the seen-set never stores text).  Fast path:
    polars' seeded row hash — vectorized Rust straight off the Arrow
    buffers, no per-row Python-object materialization, ~4x cheaper than the
    pandas siphash pair on the route hot path.  Deterministic across
    processes and driver restarts for a fixed seed (the stability the
    snapshot chain needs; the container pins the polars version).  Fallback
    when polars is absent: the original keyed pandas siphashes."""
    try:
        import polars as pl
    except ImportError:
        s = texts.to_pandas().fillna("")
        from ..stages.partition import stable_hash

        h1 = stable_hash(s).view(np.int64) & _HASH_MASK
        h2 = (pd.util.hash_pandas_object(s, index=False,
                                         hash_key="9c39a2b1f04d58e7")
              .to_numpy().view(np.int64) & _HASH_MASK)
        return h1, h2
    s = pl.from_arrow(texts).fill_null("")
    h1 = (s.hash(seed=11).to_numpy().view(np.int64) & _HASH_MASK)
    h2 = (s.hash(seed=29).to_numpy().view(np.int64) & _HASH_MASK)
    return h1, h2


def _dedup_slices(live: pa.Table,
                  num_partitions: int) -> tuple[pa.Table, np.ndarray]:
    """Second keyspace of the SAME prepared batch: (h1, h2, conv_id,
    turn_idx, ts_us) rows hash-partitioned by the post-scrub text hash.
    Only these five narrow columns ship — the text column itself stays in
    the staged turn files.  Returns the partition-sorted narrow table and
    its slice bounds; :func:`_route_pair` ships each slice inside the fold
    route's actor calls."""
    h1, h2 = _dedup_hashes(live["text"])
    part = (h1 % num_partitions).astype(np.int64)
    order = np.argsort(part, kind="stable")
    narrow = pa.table({
        "conv_id": live["conv_id"], "turn_idx": live["turn_idx"],
        "h1": pa.array(h1), "h2": pa.array(h2),
        "ts_us": live["ts_us"]}).take(pa.array(order))
    bounds = np.searchsorted(part[order], np.arange(num_partitions + 1))
    return narrow, bounds


def _route_pair(live: pa.Table, actors, epoch: int, num_partitions: int,
                source_key: str, dedup_on: bool) -> list:
    """Route BOTH keyspaces of one prepared batch with ONE actor call per
    partition: the fold slice (conv partition, :func:`_route_table` twin)
    and the dedup slice (text-hash partition) travel in the same
    ``ingest_pair`` message, so turning the dedup stream on adds hash
    compute but no extra ingest round-trips.  Hot-key partitions (ids ≥
    ``num_partitions``) only ever carry fold rows.  Returns ack refs."""
    part = live["part"].to_numpy(zero_copy_only=False)
    order = np.argsort(part, kind="stable")
    cols = _INGEST_COLS + (["pbits"] if "pbits" in live.column_names else [])
    sub = live.select(cols).take(pa.array(order))
    bounds = np.searchsorted(part[order], np.arange(len(actors) + 1))
    if dedup_on:
        narrow, dbounds = _dedup_slices(live, num_partitions)
    acks = []
    for p in range(len(actors)):
        lo, hi = int(bounds[p]), int(bounds[p + 1])
        fold = sub.slice(lo, hi - lo) if hi > lo else None
        ded = None
        if dedup_on and p < num_partitions:
            dlo, dhi = int(dbounds[p]), int(dbounds[p + 1])
            if dhi > dlo:
                ded = narrow.slice(dlo, dhi - dlo)
        if fold is None and ded is None:
            continue
        acks.append(actors[p].ingest_pair.options(concurrency_group="ingest")
                    .remote(epoch, fold, ded, source_key))
    return acks


def _emit_turns_file(sink: EpochSink, live: pa.Table, epoch: int, file_idx: int) -> int:
    """Stage the scrubbed turn rows of one input file, stably sorted by
    (conv_id, turn_idx), with epoch + per-row partition lineage (the
    reference's T7 provenance stamp, watermark_processor.py:177-186 —
    deterministic ids, NOT wall-clock)."""
    idx = pc.sort_indices(
        live, sort_keys=[("conv_id", "ascending"), ("turn_idx", "ascending")]
    )
    # select BEFORE take: the permutation gather is per-column, so routing
    # columns (ts_us/n_chars/pbits) that the turn file drops anyway must
    # not pay it.  "part" rides along for the lineage stamp below.
    out = live.select([c for c in TURN_COLS if c in live.column_names]
                      + ["part"]).take(idx)
    n = len(out)  # original "ts" column is still present (ts_us is its cast)
    part = out["part"].to_numpy(zero_copy_only=False)
    lineage_pool = pa.array(
        [f"part-{p:05d}/epoch-{epoch:05d}" for p in range(int(part.max()) + 1 if n else 1)]
    )
    lineage = pa.DictionaryArray.from_arrays(pa.array(part.astype(np.int32)),
                                             lineage_pool).cast(pa.string())
    out = out.append_column("epoch", pa.array(np.full(n, epoch, dtype=np.int64)))
    out = out.append_column("lineage", lineage)
    out = out.select(TURN_COLS)
    pq.write_table(out, sink.staging_path(epoch, "turns", file_idx))
    return n


def _emit_late_file(sink: EpochSink, late: pa.Table, epoch: int, file_idx: int) -> int:
    sub = late.select(["conv_id", "turn_idx", "ts_us"])
    idx = pc.sort_indices(
        sub, sort_keys=[("conv_id", "ascending"), ("turn_idx", "ascending")]
    )
    out = sub.take(idx)
    out = out.append_column("epoch", pa.array(np.full(len(out), epoch, dtype=np.int64)))
    pq.write_table(out, sink.staging_path(epoch, "late", file_idx))
    return len(out)


def _emit_enrich_file(sink: EpochSink, live: pa.Table, cfg: StreamConfig,
                      epoch: int, file_idx: int) -> int:
    """Stage the stream-table BROADCAST-join rows of one input file: tool
    turns decorated with the static dimension's (group, weight) — a map-side
    lookup join (dim probed with one searchsorted per batch; misses keep
    left-join semantics with 'unknown'/0.0).  Same staging/commit discipline
    as the turns stream, so enrichment is exactly-once under replays."""
    sub = live.filter(pc.equal(live["role"], "tool"))
    idx = pc.sort_indices(
        sub, sort_keys=[("conv_id", "ascending"), ("turn_idx", "ascending")])
    sub = sub.take(idx)
    tools = np.asarray([d[0] for d in cfg.enrich_dim], dtype=object)
    order = np.argsort(tools)
    tools = tools[order]
    groups = np.asarray([d[1] for d in cfg.enrich_dim], dtype=object)[order]
    weights = np.asarray([d[2] for d in cfg.enrich_dim],
                         dtype=np.float64)[order]
    tv = sub["tool"].to_numpy(zero_copy_only=False)
    n = len(tv)
    if len(tools) and n:
        pos = np.searchsorted(tools, tv).clip(max=len(tools) - 1)
        hit = tools[pos] == tv
        g = np.where(hit, groups[pos], "unknown")
        w = np.where(hit, weights[pos], 0.0)
    else:
        g = np.full(n, "unknown", dtype=object)
        w = np.zeros(n, np.float64)
    out = pa.table({
        "conv_id": sub["conv_id"],
        "turn_idx": sub["turn_idx"],
        "tool": sub["tool"],
        "tool_group": pa.array(g.astype(str)),
        "tool_weight": pa.array(w),
        "epoch": pa.array(np.full(n, epoch, dtype=np.int64))})
    pq.write_table(out, sink.staging_path(epoch, "enrich", file_idx))
    return n


def _route_file_task(files: list[str], actors, epoch: int, cfg: StreamConfig,
                     out_dir: str, wm_prev_us: int, file_idx_base: int,
                     tracker=None):
    """One routing task: read → scrub → late-split → stage turn/late output →
    ingest narrow fold columns into the state actors.

    Raw-task fast path of the micro-batch loop — a per-epoch
    ray.data.Dataset pays ~0.5 s planning/launch, which dominates micro-batch
    cadence; the file is the natural work unit of the arrival log (Dataset
    stays the API for every batch/oracle pipeline).  The late decision only
    needs ``wm_prev = watermark_after(e-1)``, which the driver knows before
    epoch e routes, so the bulky text column is written to the staged sink
    right here and never ships to the actors."""
    scrub_fn = make_scrub_batch_fn(cfg.scrub)
    sink = EpochSink(out_dir)
    rows, late_n, mx = 0, 0, -INF_US
    failed: list[str] = []
    columns = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    if cfg.fault_inject_dir:
        # fail-once per (epoch, first file): simulates a transient task crash
        # AFTER some ingests may already have landed; Ray retries the task
        # (retry_exceptions) and the keyed ingest overwrites idempotently.
        marker = os.path.join(
            cfg.fault_inject_dir,
            f"e{epoch}-{os.path.basename(files[0])}.failed")
        if not os.path.exists(marker):
            # route half the first file BEFORE failing, to make the retry
            # genuinely re-send previously-ingested tables
            pf0 = pq.ParquetFile(files[0])
            rb0 = next(pf0.iter_batches(batch_size=max(1, pf0.metadata.num_rows // 2),
                                        columns=columns))
            t0_ = _prepare_table(pa.Table.from_batches([rb0]), scrub_fn,
                                 cfg.num_partitions, cfg.hot_keys,
                                 cep_terms=cfg.cep_terms)
            _route_table(t0_, actors, epoch, source_key=f"{files[0]}#0")
            os.makedirs(cfg.fault_inject_dir, exist_ok=True)
            with open(marker, "w") as fh:
                fh.write("x")
            raise RuntimeError("injected transient route failure")
    for i, f in enumerate(files):
        # Per-file failure isolation with ALL-OR-NOTHING semantics: a file
        # that fails at ANY point — even mid-read after some batches were
        # staged and ingested — contributes nothing to the epoch.  The task
        # buffers nothing (memory stays O(route_batch_rows)); instead it
        # tracks the file's staged paths / ingest keys / watermark
        # contribution and rolls all three back on failure before recording
        # the file in failed_files (reference continue-on-failure batch
        # semantics, watermark_processor.py:197-202,243-262).
        staged: list[str] = []
        ingested: list[str] = []
        pending: deque = deque()  # in-flight ingest acks (≤ _ACK_WINDOW)
        fmx, frows, flate = -INF_US, 0, 0
        try:
            inject = (cfg.fault_midfile_file is not None
                      and os.path.basename(f) == cfg.fault_midfile_file)
            pf = pq.ParquetFile(f)
            batches = pf.iter_batches(batch_size=cfg.route_batch_rows,
                                      columns=columns)
            # Stream the file in bounded row-group batches: task memory is
            # O(route_batch_rows), not O(file size).  Each (file, batch) is a
            # deterministic unit: its own staged output file + ingest key.
            for b, rb in enumerate(batches):
                t = _prepare_table(pa.Table.from_batches([rb]), scrub_fn,
                                   cfg.num_partitions, cfg.hot_keys,
                                   cep_terms=cfg.cep_terms)
                ts = t["ts_us"].to_numpy(zero_copy_only=False)
                if len(ts):
                    fmx = max(fmx, int(ts.max()))
                late_mask = pa.array(ts < wm_prev_us)
                late_tbl = t.filter(late_mask)
                live = t.filter(pc.invert(late_mask))
                file_idx = (file_idx_base + i) * 1000 + b
                staged.append(sink.staging_path(epoch, "turns", file_idx))
                staged.append(sink.staging_path(epoch, "late", file_idx))
                _emit_turns_file(sink, live, epoch, file_idx)
                _emit_late_file(sink, late_tbl, epoch, file_idx)
                if cfg.enrich_stream and cfg.stream_on("enrich"):
                    staged.append(sink.staging_path(epoch, "enrich", file_idx))
                    _emit_enrich_file(sink, live, cfg, epoch, file_idx)
                acks = _route_pair(live, actors, epoch, cfg.num_partitions,
                                   f"{f}#{b}",
                                   dedup_on=(cfg.dedup_stream
                                             and cfg.stream_on("dedup")))
                # Pipelined acks: keep up to ACK_WINDOW batches' ingests in
                # flight so the NEXT batch's read+scrub+stage overlaps the
                # previous ingest RTT instead of serializing behind it.
                # Safe because the ingest concurrency group is width 1 and
                # Ray preserves per-caller submission order: a retract
                # submitted after these ingests always executes after them,
                # so recording the key at SEND time keeps the all-or-nothing
                # rollback exact even for in-flight batches.
                pending.append(acks)
                ingested.append(f"{f}#{b}")
                while len(pending) > cfg.ack_window:
                    ray.get(pending.popleft())
                frows += len(t)
                flate += len(late_tbl)
                if tracker is not None:  # fire-and-forget live progress
                    tracker.add.remote(epoch, len(t))
                if inject:
                    raise RuntimeError("injected mid-file route failure")
            while pending:  # drain before declaring the file complete
                ray.get(pending.popleft())
            if tracker is not None:
                tracker.add.remote(epoch, 0, 0, 1)  # whole file done
        except Exception:
            for p in staged:
                if os.path.exists(p):
                    os.remove(p)
            if ingested:
                ray.get([a.retract.options(concurrency_group="ingest")
                         .remote(epoch, ingested) for a in actors])
            failed.append(f)
            continue
        rows += frows
        late_n += flate
        mx = max(mx, fmx)
    return rows, late_n, mx, failed


class StreamingEngine:
    """Bounded-replayable streaming run over a list of Parquet files.

    The input file list in arrival order is sliced into epochs of
    ``epoch_files`` files each, plus one final flush epoch (watermark → ∞).
    ``run()`` resumes from the last contiguous committed epoch marker.
    """

    def __init__(self, input_paths: list[str], out_dir: str,
                 cfg: StreamConfig | None = None, epoch_files: int = 1,
                 actor_cpus: float = 0.25, auto_hot_keys: bool = False,
                 hot_key_frac: float = 0.05, hot_key_sample_files: int = 4,
                 actor_spread: bool = True):
        self.cfg = cfg or StreamConfig()
        self.paths = sorted(input_paths)
        # Pre-flight (reference P2/P3: reject bad input/destination BEFORE any
        # work, ui/app_ui.py:284-321) — a bad path must fail the run here, not
        # get silently dead-lettered by the per-file failure isolation.
        if not out_dir:
            raise ValueError("StreamingEngine: output directory is required")
        bad = [p for p in self.paths
               if not p.lower().endswith(".parquet") or not os.path.isfile(p)]
        if bad:
            raise ValueError(
                f"StreamingEngine: {len(bad)} input path(s) missing or not "
                f".parquet: {bad[:3]}")
        if epoch_files < 1:
            raise ValueError("StreamingEngine: epoch_files must be >= 1")
        self.out_dir = out_dir
        self.epoch_files = epoch_files
        self.actor_cpus = actor_cpus
        # Multi-node: SPREAD best-effort places the P state actors on
        # distinct nodes so keyed-state memory and snapshot I/O scale with
        # the cluster instead of stacking on one host (no-op single-node).
        # See MULTINODE.md.
        self.actor_spread = actor_spread
        self.sink = EpochSink(out_dir)
        if auto_hot_keys and self.paths:
            from dataclasses import replace as _replace

            hk = self._detect_or_load_hot_keys(hot_key_frac, hot_key_sample_files)
            if hk:
                self.cfg = _replace(self.cfg, hot_keys=hk)
        # Partition-layout guard: the key→partition routing (P + hot keys)
        # is part of the checkpoint's meaning.  Persist it write-once; a
        # resume under a DIFFERENT layout would silently split every key's
        # state from its future rows, so refuse it and point at the
        # sanctioned rescale path (state/reshard.reshard_checkpoint).
        layout = read_layout(out_dir)
        if layout is None:
            write_layout(out_dir, layout_of(self.cfg))
        elif not layout_matches(layout, self.cfg):
            raise ValueError(
                f"StreamingEngine: checkpoint at {out_dir} was written with "
                f"P={layout['num_partitions']} hot_keys="
                f"{layout['hot_keys']} emit_streams="
                f"{layout.get('emit_streams')} wquant_ps="
                f"{layout.get('wquant_ps')}; resuming with "
                f"P={self.cfg.num_partitions} hot_keys="
                f"{list(self.cfg.hot_keys)} emit_streams="
                f"{self.cfg.emit_streams and sorted(self.cfg.emit_streams)} "
                f"wquant_ps={self.cfg.wquant_ps} would mis-route or "
                f"mis-emit keyed state. For a partition-count change run "
                f"state.reshard.reshard_checkpoint(out_dir, old_cfg, "
                f"new_cfg) first; the stream set must stay identical "
                f"across a resume chain.")
        self.epochs = [self.paths[i:i + epoch_files]
                       for i in range(0, len(self.paths), epoch_files)]
        self._tracker = None
        self._last_progress: dict = {}
        # retry transient exceptions: combined with keyed idempotent ingest +
        # deterministic staged file names, a retried route task is exactly-once
        self._route_task = ray.remote(num_cpus=1, max_retries=3,
                                      retry_exceptions=True)(_route_file_task)

    def _detect_or_load_hot_keys(self, frac: float, sample_files: int) -> tuple:
        """Plan-time hot-conversation detection, PERSISTED write-once so a
        resumed run reuses the identical partitioning (hot keys change the
        key→partition routing; changing them mid-run would split state).

        Samples the conv_id column of the first arrival files (column-pruned
        footer reads, bounded by the sample) — the streaming analog of
        ``stages/partition.detect_hot_keys``.  Detected keys get reserved
        partitions; they are never salted (SURVEY §7.4 "Skew vs sessions")."""
        import collections
        import json

        path = os.path.join(self.out_dir, "_hot_keys.json")
        if os.path.exists(path):
            with open(path) as f:
                return tuple(json.load(f)["hot_keys"])
        counts: collections.Counter = collections.Counter()
        total = 0
        for f in self.paths[:sample_files]:
            col = pq.read_table(f, columns=["conv_id"])["conv_id"].to_pandas()
            counts.update(col.value_counts().to_dict())
            total += len(col)
        hot = [k for k, c in counts.items() if total and c > total * frac]
        hot_t = tuple(sorted(hot, key=lambda k: (-counts[k], k))[:8])
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"hot_keys": list(hot_t), "sampled_rows": total}, f)
        os.replace(tmp, path)  # write-once: resume reads, never re-detects
        return hot_t

    @property
    def n_input_epochs(self) -> int:
        return len(self.epochs)

    def _make_actors(self, restore_epoch: int):
        # Two concurrency groups: "ingest" and "state" each single-threaded.
        # close_epoch(e) (group "state", long) must not block ingest(e+1)
        # (group "ingest", cheap) — otherwise the pipelined epoch's routing
        # tasks stall behind the previous epoch's close in the actor queue.
        # Closes stay mutually serialized (state integrity); the buffer dict
        # is the only shared structure (per-epoch keys, GIL-atomic ops).
        opts = dict(num_cpus=self.actor_cpus,
                    concurrency_groups={"ingest": 1, "state": 1})
        if self.actor_spread:
            opts["scheduling_strategy"] = "SPREAD"
        cls = ray.remote(**opts)(StatePartition)
        actors = [cls.remote(p, self.cfg, self.out_dir, restore_epoch)
                  for p in range(self.cfg.total_partitions)]
        ray.get([a.ping.remote() for a in actors])  # warm before any routing
        return actors

    def progress(self) -> dict:
        """LIVE per-epoch progress {epoch: {rows, batches, files}} while a
        run is in flight (advisory, at-least-once under retries); after the
        run, the final snapshot.  Committed markers (``metrics_df``) remain
        the exact source of truth."""
        if self._tracker is not None:
            try:
                return ray.get(self._tracker.snapshot.remote(), timeout=10)
            except Exception:
                return dict(self._last_progress)
        return dict(self._last_progress)

    def compact(self, streams: tuple[str, ...] | None = None) -> dict:
        """Compact every committed epoch's many small per-task files into one
        Parquet file per (stream, epoch) via the sink's crash-safe directory
        swap (reference S6 output compaction, ``watermark_processor.py:166``).
        Run between runs only — no concurrent readers.  Returns rows
        compacted per (stream, epoch) (0 = already single-file)."""
        from ..sinks.parquet import STREAMS

        out: dict[str, int] = {}
        for s in streams or STREAMS:
            for e in self.sink.committed_epochs():
                if not os.path.isdir(self.sink.data_dir(s, e)):
                    continue  # e.g. the flush epoch emits no turns
                out[f"{s}/epoch={e}"] = self.sink.compact_epoch(s, e)
        return out

    def prune_state(self) -> dict:
        """Checkpoint GC (run between runs, like ``compact``): resume only
        walks the snapshot chain back to the newest epoch where EVERY
        partition has a FULL snapshot, so state dirs strictly below that
        epoch are dead weight — at 100 TB, per-epoch delta snapshots
        accumulate forever without this.  Returns the chain base epoch and
        the pruned epoch list."""
        import shutil

        from ..state.store import SortedStateStore

        layout = read_layout(self.out_dir)
        last = self.sink.last_contiguous_epoch()
        base = last
        while base >= 0:
            # resolve through the layout: a committed reshard's FULL
            # snapshot at its epoch is a valid chain base
            paths = [checkpoint_state_path(self.sink, layout, base, p)
                     for p in range(self.cfg.total_partitions)]
            if all(os.path.exists(p) for p in paths) and all(
                    SortedStateStore.snapshot_mode(p) == "full"
                    for p in paths):
                break
            base -= 1
        pruned = []
        state_root = os.path.join(self.out_dir, "_state")
        live_rdir = (layout or {}).get("reshard") or {}
        if base > 0:
            for d in sorted(os.listdir(state_root)):
                if not d.startswith("epoch="):
                    continue
                e = int(d.split("=", 1)[1])
                if e < base:
                    shutil.rmtree(os.path.join(state_root, d))
                    pruned.append(e)
        # reshard dirs: keep only the layout's current one, and only while
        # a chain can still walk to it (its epoch >= base)
        for d in sorted(os.listdir(state_root)) if os.path.isdir(state_root) \
                else []:
            if not d.startswith("reshard-"):
                continue
            keep = (d == live_rdir.get("dir")
                    and live_rdir.get("epoch", -1) >= base)
            if not keep:
                shutil.rmtree(os.path.join(state_root, d))
                pruned.append(d)
        return {"chain_base_epoch": base, "pruned": pruned}

    def metrics_df(self) -> pd.DataFrame:
        """Per-(epoch, partition) observability from the committed markers:
        rows routed, late drops, state size, emission counts, phase timings —
        the engine's answer to the reference's progress/status variables
        (``watermark_processor.py:162-163,250-258``) and the per-partition
        throughput/lag metrics the north rule asks for."""
        rows = []
        for e in self.sink.committed_epochs():
            m = self.sink.read_marker(e)
            for pm in m["partitions"]:
                rec = {"epoch": e, "watermark_us": m["watermark_us"],
                       "epoch_s": m["epoch_s"],
                       **{k: v for k, v in pm.items()
                          if k not in ("emitted", "stream_s")}}
                for k, v in pm.get("emitted", {}).items():
                    rec[f"emitted_{k}"] = v
                for k, v in (pm.get("stream_s") or {}).items():
                    rec[f"stream_s_{k}"] = v
                rows.append(rec)
        df = pd.DataFrame(rows)
        if len(df):
            df["rows_per_s"] = (df["rows"] / df["epoch_s"].replace(0, float("nan"))).round(1)
            if "max_ts_us" in df.columns:
                # event-time lag of each partition behind the epoch watermark
                df["wm_lag_us"] = df["watermark_us"] - df["max_ts_us"]
        return df

    def run(self, kill_after_epoch: int | None = None,
            kill_mid_epoch: int | None = None) -> dict:
        """Run (or resume) the stream to completion; returns run summary.

        ``kill_after_epoch`` / ``kill_mid_epoch`` simulate crashes for the
        resume tests: stop after committing epoch e, or after ingesting epoch
        e but BEFORE its close/commit.
        """
        last = self.sink.last_contiguous_epoch()
        final_epoch = self.n_input_epochs  # the flush epoch
        if last >= final_epoch:
            return {"resumed_done": True, "epochs": []}
        max_ts = -INF_US
        if last >= 0:
            max_ts = int(self.sink.read_marker(last)["max_ts_us"])
        actors = self._make_actors(restore_epoch=last)
        self._tracker = ProgressTracker.remote()
        summaries = []
        # Pipelined epoch loop: the close+commit of epoch e overlaps with the
        # routing of epoch e+1 (per-epoch ingest buffers keep them disjoint;
        # actor task ordering keeps close(e) before close(e+1) per partition).
        pending: tuple | None = None  # (epoch, close_refs, marker_base)
        failed_files: list[str] = []  # per-epoch dead-letter file accumulator

        def drain() -> None:
            nonlocal pending
            if pending is None:
                return
            pe, refs, marker = pending
            marker["partitions"] = ray.get(list(refs))
            marker["epoch_s"] = round(time.monotonic() - marker.pop("_t0"), 4)
            self.sink.commit_epoch(pe, marker)
            summaries.append(marker)
            pending = None


        try:
            for e in range(last + 1, final_epoch + 1):
                t0 = time.monotonic()
                # wm_prev = watermark_after(e-1): known BEFORE epoch e routes,
                # so the route tasks make the late decision and emit turns
                # themselves.  (Routing of e overlaps the still-running closes
                # of e-1 — the close-route pipeline.)
                wm_prev = max_ts - self.cfg.lateness_us
                rows = 0
                late_rows = 0
                if e < final_epoch:
                    refs = [
                        self._route_task.remote([f], actors, e, self.cfg,
                                                self.out_dir, wm_prev, i,
                                                self._tracker)
                        for i, f in enumerate(self.epochs[e])
                    ]
                    for r, ln, m, failed in ray.get(refs):
                        rows += r
                        late_rows += ln
                        max_ts = max(max_ts, m)
                        failed_files.extend(failed)
                    if kill_mid_epoch == e:
                        drain()  # crash point: previous epoch committed, e not
                        return {"killed_mid": e}
                    wm_after = max_ts - self.cfg.lateness_us
                else:
                    wm_after = INF_US  # flush everything
                close_refs = [a.close_epoch.options(concurrency_group="state")
                              .remote(e, wm_prev, wm_after) for a in actors]
                drain()  # finish epoch e-1 while e's closes run
                pending = (e, close_refs, {
                    "epoch": e,
                    "rows": rows,
                    "late_rows": late_rows,
                    "max_ts_us": max_ts,
                    "watermark_us": wm_after,
                    "failed_files": list(failed_files),
                    "_t0": t0,
                })
                failed_files.clear()
                if kill_after_epoch == e:
                    drain()
                    return {"killed_after": e, "epochs": summaries}
            drain()
        finally:
            try:
                # fire-and-forget adds may still be in flight after the route
                # tasks returned: poll until the snapshot stabilizes (advisory)
                prev: dict | None = None
                for _ in range(100):
                    snap = ray.get(self._tracker.snapshot.remote(), timeout=10)
                    if snap == prev:
                        break
                    prev = snap
                    time.sleep(0.05)
                self._last_progress = prev or {}
            except Exception:
                pass
            ray.kill(self._tracker)
            self._tracker = None
            for a in actors:
                ray.kill(a)
        all_failed = [f for m in summaries for f in m.get("failed_files", [])]
        # A3 analog: True iff zero failures (watermark_processor.py:277,281);
        # failed_files_sample mirrors the reference's top-10 display limit
        # (O2, watermark_processor.py:275 failed_files[:10]).
        return {"epochs": summaries, "failed_files": all_failed,
                "failed_files_sample": all_failed[:10],
                "all_succeeded": not all_failed}
