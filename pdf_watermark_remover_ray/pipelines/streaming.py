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

    read_parquet(files[e])                       # stateless Ray tasks
      → map_batches(scrub ∘ partition ∘ stamp)   # vectorized, Arrow
      → map_batches(route)                       # push sub-tables to the
                                                 #   partition state actors
    actors.close_epoch(e, wm_prev, wm_after)     # late-drop, merge state,
                                                 #   emit, stage outputs+snapshot
    sink.commit_epoch(e, marker)                 # atomic publish; marker IS
                                                 #   the commit point

Determinism: the watermark after epoch e is ``max(ts over epochs ≤ e) −
lateness`` — a pure function of input + epoch slicing — and every emission
rule is strict against it, so a killed run resumed from the last marker
re-emits byte-identical rows (tests/test_streaming.py).

Emission rules (all STRICT so no non-late future row can contradict them;
a future non-late arrival in epoch f has ts ≥ wm_after(f−1) ≥ wm_after(e)):

- turn rows:     emitted at the close of their arrival epoch (late ones go to
                 the ``late`` dead-letter stream instead);
- sessions:      closed when ``end_us < wm_after − gap`` (no joinable future);
- tumbling win:  emitted when ``window_start + size ≤ wm_after``;
- join matches:  a tool turn fires when ``ts < wm_after``, matched to the
                 latest buffered user turn within the gap (ties → larger
                 turn_idx, same as the batch oracle in stages/join.py).
"""

from __future__ import annotations

import time

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import ray
import ray.data

from ..config import StreamConfig
from ..functions.scrub import make_scrub_batch_fn
from ..sinks.parquet import EpochSink
from ..stages.partition import partition_table
from ..state.store import SortedStateStore, merge_session_intervals

INF_US = (1 << 62)

TURN_COLS = ["conv_id", "turn_idx", "role", "text", "tool", "ts", "modified",
             "epoch", "lineage"]


class StatePartition:
    """One hash partition's keyed state (SURVEY.md §2.4 ST5).

    Constructed once per partition and reused across every epoch of the run —
    the actor-pool analog of the reference's single ``WatermarkProcessor``
    instance reused for every file (``main/remove_watermark.py:53``).
    Ingestion is idempotent (rows are keyed by unique ``(conv_id, turn_idx)``
    and deduped at close), so Ray task retries cannot double-count.
    """

    def __init__(self, partition_id: int, cfg: StreamConfig, out_dir: str,
                 restore_epoch: int = -1):
        self.pid = partition_id
        self.cfg = cfg
        self.sink = EpochSink(out_dir)
        self.buffer: list[pa.Table] = []
        if restore_epoch >= 0:
            self.store = SortedStateStore.restore(
                self.sink.state_path(restore_epoch, partition_id)
            )
        else:
            self.store = SortedStateStore()

    def ingest(self, epoch: int, table: pa.Table) -> int:
        self.buffer.append(table)
        return table.num_rows

    # -- epoch close -------------------------------------------------------

    def close_epoch(self, epoch: int, wm_prev_us: int, wm_after_us: int) -> dict:
        t0 = time.monotonic()
        cfg = self.cfg
        buf = (
            pa.concat_tables(self.buffer).to_pandas()
            if self.buffer
            else pd.DataFrame(
                {c: pd.Series([], dtype=d) for c, d in
                 [("conv_id", str), ("turn_idx", np.int32), ("role", str),
                  ("text", object), ("tool", str), ("ts_us", np.int64),
                  ("modified", bool)]}
            )
        )
        self.buffer = []
        # Retry idempotence: rows are unique by (conv_id, turn_idx); a retried
        # route task re-sends identical content, so keep-first is exact.
        buf = buf.drop_duplicates(subset=["conv_id", "turn_idx"])
        # Deterministic late-drop vs the watermark BEFORE this epoch.
        late_mask = buf["ts_us"].to_numpy(np.int64, copy=False) < wm_prev_us \
            if len(buf) else np.zeros(0, dtype=bool)
        late = buf[late_mask]
        live = buf[~late_mask]

        n_sessions = self._fold_sessions(live)
        n_windows = self._fold_windows(live)
        self._fold_join(live)

        emitted = {
            "turns": self._emit_turns(live, epoch),
            "late": self._emit_late(late, epoch),
            "sessions": self._emit_sessions(wm_after_us, epoch),
            "windows": self._emit_windows(wm_after_us, epoch),
            "matches": self._emit_matches(wm_after_us, epoch),
        }
        self.store.snapshot(self.sink.staging_state_path(epoch, self.pid))
        return {
            "partition": self.pid,
            "rows": int(len(buf)),
            "late_dropped": int(len(late)),
            "state_rows": int(self.store.total_rows()),
            "emitted": {k: int(v) for k, v in emitted.items()},
            "close_s": round(time.monotonic() - t0, 4),
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
        merged = merge_session_intervals(
            pd.concat([self.store.get("sessions"), new], ignore_index=True),
            self.cfg.session_gap_us,
        )
        self.store.put("sessions", merged)
        return len(merged)

    def _fold_windows(self, live: pd.DataFrame) -> int:
        if len(live) == 0:
            return 0
        ws = (live["ts_us"].to_numpy(np.int64) // self.cfg.tumbling_us) * self.cfg.tumbling_us
        new = pd.DataFrame({"conv_id": live["conv_id"].to_numpy(), "window_start_us": ws,
                            "n": np.ones(len(live), dtype=np.int64)})
        allw = pd.concat([self.store.get("windows"), new], ignore_index=True)
        agg = allw.groupby(["conv_id", "window_start_us"], sort=False, as_index=False)["n"].sum()
        self.store.put("windows", agg)
        return len(agg)

    def _fold_join(self, live: pd.DataFrame) -> None:
        if len(live) == 0:
            return
        u = live[live["role"] == "user"]
        t = live[live["role"] == "tool"]
        if len(u):
            nu = pd.DataFrame({"conv_id": u["conv_id"].to_numpy(),
                               "ts_us": u["ts_us"].to_numpy(np.int64),
                               "turn_idx": u["turn_idx"].to_numpy(np.int32)})
            self.store.put("users", pd.concat([self.store.get("users"), nu],
                                              ignore_index=True))
        if len(t):
            nt = pd.DataFrame({"conv_id": t["conv_id"].to_numpy(),
                               "ts_us": t["ts_us"].to_numpy(np.int64),
                               "turn_idx": t["turn_idx"].to_numpy(np.int32),
                               "tool": t["tool"].to_numpy()})
            self.store.put("tools", pd.concat([self.store.get("tools"), nt],
                                              ignore_index=True))

    # -- emissions ---------------------------------------------------------

    def _write(self, stream: str, epoch: int, df: pd.DataFrame, schema: pa.Schema) -> int:
        path = self.sink.staging_path(epoch, stream, self.pid)
        pq.write_table(pa.Table.from_pandas(df, schema=schema, preserve_index=False), path)
        return len(df)

    def _emit_turns(self, live: pd.DataFrame, epoch: int) -> int:
        out = live.sort_values(["conv_id", "turn_idx"], kind="mergesort").copy()
        out["ts"] = out["ts_us"].to_numpy(np.int64).astype("datetime64[us]")
        out["epoch"] = np.int64(epoch)
        # Provenance stamp (reference T7, watermark_processor.py:177-186) —
        # deterministic lineage id, NOT wall-clock.
        out["lineage"] = f"part-{self.pid:05d}/epoch-{epoch:05d}"
        schema = pa.schema(
            [("conv_id", pa.string()), ("turn_idx", pa.int32()), ("role", pa.string()),
             ("text", pa.string()), ("tool", pa.string()), ("ts", pa.timestamp("us")),
             ("modified", pa.bool_()), ("epoch", pa.int64()), ("lineage", pa.string())]
        )
        return self._write("turns", epoch, out[TURN_COLS], schema)

    def _emit_late(self, late: pd.DataFrame, epoch: int) -> int:
        out = late.sort_values(["conv_id", "turn_idx"], kind="mergesort")[
            ["conv_id", "turn_idx", "ts_us"]].copy()
        out["epoch"] = np.int64(epoch)
        schema = pa.schema([("conv_id", pa.string()), ("turn_idx", pa.int32()),
                            ("ts_us", pa.int64()), ("epoch", pa.int64())])
        return self._write("late", epoch, out, schema)

    def _emit_sessions(self, wm_us: int, epoch: int) -> int:
        s = self.store.get("sessions")
        closed_mask = s["end_us"].to_numpy(np.int64, copy=False) < wm_us - self.cfg.session_gap_us \
            if len(s) else np.zeros(0, dtype=bool)
        closed = s[closed_mask]
        self.store.put("sessions", s[~closed_mask])
        out = pd.DataFrame(
            {"conv_id": closed["conv_id"].to_numpy(),
             "session_start_us": closed["start_us"].to_numpy(np.int64),
             "session_end_us": closed["end_us"].to_numpy(np.int64),
             "n_turns": closed["n"].to_numpy(np.int64)}
        ).sort_values(["conv_id", "session_start_us"], kind="mergesort")
        schema = pa.schema([("conv_id", pa.string()), ("session_start_us", pa.int64()),
                            ("session_end_us", pa.int64()), ("n_turns", pa.int64())])
        return self._write("sessions", epoch, out, schema)

    def _emit_windows(self, wm_us: int, epoch: int) -> int:
        w = self.store.get("windows")
        size = self.cfg.tumbling_us
        done_mask = (w["window_start_us"].to_numpy(np.int64, copy=False) + size <= wm_us) \
            if len(w) else np.zeros(0, dtype=bool)
        done = w[done_mask]
        self.store.put("windows", w[~done_mask])
        out = pd.DataFrame(
            {"conv_id": done["conv_id"].to_numpy(),
             "window_start_us": done["window_start_us"].to_numpy(np.int64),
             "n_turns": done["n"].to_numpy(np.int64)}
        ).sort_values(["conv_id", "window_start_us"], kind="mergesort")
        schema = pa.schema([("conv_id", pa.string()), ("window_start_us", pa.int64()),
                            ("n_turns", pa.int64())])
        return self._write("windows", epoch, out, schema)

    def _emit_matches(self, wm_us: int, epoch: int) -> int:
        users = self.store.get("users")
        tools = self.store.get("tools")
        gap = self.cfg.join_gap_us
        fire_mask = tools["ts_us"].to_numpy(np.int64, copy=False) < wm_us \
            if len(tools) else np.zeros(0, dtype=bool)
        fire = tools[fire_mask]
        self.store.put("tools", tools[~fire_mask])
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
            self.store.put("users", users[keep])
        return n


class StreamingEngine:
    """Bounded-replayable streaming run over a list of Parquet files.

    The input file list in arrival order is sliced into epochs of
    ``epoch_files`` files each, plus one final flush epoch (watermark → ∞).
    ``run()`` resumes from the last contiguous committed epoch marker.
    """

    def __init__(self, input_paths: list[str], out_dir: str,
                 cfg: StreamConfig | None = None, epoch_files: int = 1,
                 actor_cpus: float = 0.25):
        self.cfg = cfg or StreamConfig()
        self.paths = sorted(input_paths)
        self.out_dir = out_dir
        self.epoch_files = epoch_files
        self.actor_cpus = actor_cpus
        self.sink = EpochSink(out_dir)
        self.epochs = [self.paths[i:i + epoch_files]
                       for i in range(0, len(self.paths), epoch_files)]

    @property
    def n_input_epochs(self) -> int:
        return len(self.epochs)

    def _make_actors(self, restore_epoch: int):
        cls = ray.remote(num_cpus=self.actor_cpus)(StatePartition)
        return [cls.remote(p, self.cfg, self.out_dir, restore_epoch)
                for p in range(self.cfg.num_partitions)]

    def _epoch_dataset(self, files: list[str]):
        cfg = self.cfg
        scrub_fn = make_scrub_batch_fn(cfg.scrub)
        num_partitions = cfg.num_partitions

        def prepare(t: pa.Table) -> pa.Table:
            t = scrub_fn(t)
            ts_us = t["ts"].cast(pa.int64())
            t = t.append_column("ts_us", ts_us)
            part = partition_table(t, "conv_id", num_partitions)
            return t.append_column("part", pa.array(part))

        ds = ray.data.read_parquet(
            files, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
        )
        return ds.map_batches(prepare, batch_format="pyarrow", zero_copy_batch=True)

    def _route(self, ds, actors, epoch: int) -> pd.DataFrame:
        """Push each batch's sub-tables to their partition actors; returns the
        per-task summaries (rows, max ts) the watermark folds over."""
        ingest_cols = ["conv_id", "turn_idx", "role", "text", "tool", "ts_us", "modified"]

        def route(t: pa.Table) -> pa.Table:
            part = t["part"].to_numpy(zero_copy_only=False)
            ts = t["ts_us"].to_numpy(zero_copy_only=False)
            sub = t.select(ingest_cols)
            acks = []
            for p in np.unique(part):
                idx = np.flatnonzero(part == p)
                acks.append(actors[int(p)].ingest.remote(epoch, sub.take(pa.array(idx))))
            ray.get(acks)  # backpressure: task completes only once state holds the rows
            mx = int(ts.max()) if len(ts) else -INF_US
            return pa.table({"rows": pa.array([len(t)], pa.int64()),
                             "max_ts_us": pa.array([mx], pa.int64())})

        return ds.map_batches(route, batch_format="pyarrow", zero_copy_batch=True).to_pandas()

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
        summaries = []
        try:
            for e in range(last + 1, final_epoch + 1):
                t0 = time.monotonic()
                wm_prev = max_ts - self.cfg.lateness_us
                rows = 0
                if e < final_epoch:
                    ds = self._epoch_dataset(self.epochs[e])
                    summary = self._route(ds, actors, e)
                    if len(summary):
                        rows = int(summary["rows"].sum())
                        max_ts = max(max_ts, int(summary["max_ts_us"].max()))
                    if kill_mid_epoch == e:
                        return {"killed_mid": e}
                    wm_after = max_ts - self.cfg.lateness_us
                else:
                    wm_after = INF_US  # flush everything
                metrics = ray.get(
                    [a.close_epoch.remote(e, wm_prev, wm_after) for a in actors]
                )
                marker = {
                    "epoch": e,
                    "rows": rows,
                    "max_ts_us": max_ts,
                    "watermark_us": wm_after,
                    "epoch_s": round(time.monotonic() - t0, 4),
                    "partitions": metrics,
                }
                self.sink.commit_epoch(e, marker)
                summaries.append(marker)
                if kill_after_epoch == e:
                    return {"killed_after": e, "epochs": summaries}
        finally:
            for a in actors:
                ray.kill(a)
        return {"epochs": summaries}
