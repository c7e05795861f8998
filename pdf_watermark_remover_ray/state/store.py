"""Per-partition sorted state store with Parquet snapshots.

The RocksDB-style keyed state of the north rule: each hash partition of the
conversation key owns one :class:`SortedStateStore` holding the open windows,
session intervals and join buffers for its key range, kept sorted by key so
merges and range evictions are vectorized scans, and snapshotted to Parquet at
every epoch commit (the engine's durable checkpoint — descendant of the
reference's write-once marker-file pattern, ``ui/dialog_windows.py:31-35``:
presence of a marker ⇒ the work it stands for is done and is skipped).

State kinds (all pandas DataFrames sorted by their key columns):

- ``sessions``: open session intervals  (conv_id, start_us, end_us, n)
- ``users``:    joinable user turns     (conv_id, ts_us, turn_idx)
- ``tools``:    pending tool turns      (conv_id, ts_us, turn_idx, tool)
- ``wstats``:   open tumbling windows   (conv_id, window_start_us, n/sum/min/max)
- ``seen``:     streaming-dedup hash set + event-time high mark (h1, h2, ts_us)

Snapshots store every kind in ONE Parquet file per partition with a ``kind``
discriminator column, so restore is a single columnar read.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

_EMPTY = {
    "sessions": {"conv_id": str, "start_us": np.int64, "end_us": np.int64, "n": np.int64},
    "users": {"conv_id": str, "ts_us": np.int64, "turn_idx": np.int32},
    "tools": {"conv_id": str, "ts_us": np.int64, "turn_idx": np.int32, "tool": str},
    # per-window VALUE aggregate state (n/sum/min/max of turn text length);
    # BOTH tumbling output streams (count windows + value stats) project
    # from this one kind, so there is no separate "windows" state.
    "wstats": {"conv_id": str, "window_start_us": np.int64, "n": np.int64,
               "sum_c": np.int64, "min_c": np.int64, "max_c": np.int64},
    # "sliding" holds per-(conv, slide-bucket) counts; window_start_us is the
    # BUCKET start (windows are rolled up from buckets at emission time).
    "sliding": {"conv_id": str, "window_start_us": np.int64, "n": np.int64},
    # per-window per-tool COUNT state: one row per (conv, window, tool) with
    # its occurrence count — folds by groupby-sum (decomposable), bounded by
    # open windows × tool cardinality.  TWO output streams project from it:
    # windowed COUNT DISTINCT (row count per group) and windowed top-k tools
    # (sort by count within group) — one fold, one eviction.
    "wtools": {"conv_id": str, "window_start_us": np.int64, "tool": str,
               "n": np.int64},
    # "meta" holds scalar state (e.g. the sliding emission bound) as rows.
    "meta": {"conv_id": str, "n": np.int64},
    # "seen" is the streaming-dedup hash set (104-bit composite text hash,
    # partitioned by h1) with each hash's event-time high mark — append-only
    # in exact mode; with a TTL, rows below wm − ttl evict at close.  Delta
    # snapshots carry the epoch's (new or ts-advanced) rows; restore
    # groupby-maxes the chain so re-appended hashes keep their latest mark.
    "seen": {"h1": np.int64, "h2": np.int64, "ts_us": np.int64},
    # CEP open-turn buffer: every accepted turn within the cep_within_us
    # horizon, with its role as a small-int code in the reused "n" column
    # (the "meta" trick — no extra snapshot column).  Append-only with a
    # pure ts threshold eviction (keep ts >= wm − within), so it
    # delta-snapshots exactly like the join buffers.
    "cepbuf": {"conv_id": str, "turn_idx": np.int32, "n": np.int64,
               "ts_us": np.int64},
    # CEP NEGATION (timeout) state: "pend" = trigger turns awaiting an
    # expected turn (removed when cleared or fired — bounded by triggers
    # inside one timeout horizon); "arep" = expected-turn event times within
    # the horizon (pure ts-threshold eviction: keep ts >= wm).  Both are
    # bounded open-state kinds → full-snapshot every epoch like sessions.
    "pend": {"conv_id": str, "turn_idx": np.int32, "ts_us": np.int64},
    "arep": {"conv_id": str, "ts_us": np.int64},
    # per-window per-LENGTH-VALUE counts: the windowed-percentile state
    # (wquant stream) — exact quantiles fold as groupby-sum because the
    # value domain (post-scrub text length) is discrete; bounded by open
    # windows x distinct lengths, so it full-snapshots like wtools.
    "wquant": {"conv_id": str, "window_start_us": np.int64, "val": np.int64,
               "n": np.int64},
}

_SORT_KEYS = {
    "sessions": ["conv_id", "start_us"],
    "users": ["conv_id", "ts_us", "turn_idx"],
    "tools": ["conv_id", "ts_us", "turn_idx"],
    "wstats": ["conv_id", "window_start_us"],
    "sliding": ["conv_id", "window_start_us"],
    "wtools": ["conv_id", "window_start_us", "tool"],
    "meta": ["conv_id"],
    "seen": ["h1", "h2"],
    "cepbuf": ["conv_id", "turn_idx"],
    "pend": ["conv_id", "ts_us", "turn_idx"],
    "arep": ["conv_id", "ts_us"],
    "wquant": ["conv_id", "window_start_us", "val"],
}

# Superset schema used by the single-file snapshot.
_SNAP_COLS = ["kind", "conv_id", "start_us", "end_us", "n", "ts_us", "turn_idx", "tool",
              "window_start_us", "sum_c", "min_c", "max_c", "h1", "h2", "val"]

# Arrow types of the snapshot superset (everything numeric is int64 except
# turn_idx; kind/conv_id/tool are strings).
_SNAP_TYPES = {"kind": pa.string(), "conv_id": pa.string(),
               "tool": pa.string(), "turn_idx": pa.int32()}


def _snap_type(c: str) -> pa.DataType:
    return _SNAP_TYPES.get(c, pa.int64())


_SNAP_SCHEMA = pa.schema([(c, _snap_type(c)) for c in _SNAP_COLS])


def _empty_frame(kind: str) -> pd.DataFrame:
    return pd.DataFrame({c: pd.Series([], dtype=t) for c, t in _EMPTY[kind].items()})


class SortedStateStore:
    """Sorted keyed state for one hash partition."""

    def __init__(self) -> None:
        self.frames: dict[str, pd.DataFrame] = {k: _empty_frame(k) for k in _EMPTY}

    def get(self, kind: str) -> pd.DataFrame:
        return self.frames[kind]

    def put(self, kind: str, df: pd.DataFrame, presorted: bool = False) -> None:
        """Replace one state kind; re-sorts by its key columns (stable).

        ``presorted=True`` skips the sort — pass it ONLY when ``df`` is
        provably already in ``_SORT_KEYS[kind]`` order: a boolean-mask /
        slice filter of a state frame (order-preserving), a snapshot frame
        (written in state order), or a sort=True groupby keyed exactly on
        the sort keys.  The object-string lexsort on conv_id is a top
        close-path cost, so the no-op re-sorts are worth eliding.
        """
        cols = list(_EMPTY[kind].keys())
        df = df[cols]
        if not presorted:
            df = df.sort_values(_SORT_KEYS[kind], kind="mergesort")
        self.frames[kind] = df.reset_index(drop=True)

    def total_rows(self) -> int:
        return sum(len(f) for f in self.frames.values())

    # -- snapshot / restore ------------------------------------------------
    #
    # Incremental checkpointing (VERDICT r1 #6): the bulky state kinds are
    # the append-only join buffers ("users"/"tools"), whose eviction is a
    # pure monotone-watermark ts threshold (users: keep ts >= wm - gap;
    # tools: keep ts >= wm).  A DELTA snapshot therefore only needs the
    # epoch's APPENDED rows — restore concatenates the last full snapshot
    # with the delta chain and applies the final thresholds, reconstructing
    # the exact post-close state.  The bounded "open" kinds (sessions /
    # windows / sliding / meta) are written full every epoch; they scale
    # with active keys, not stream length.  Snapshot I/O per epoch is thus
    # O(epoch delta + open state), not O(total state).

    # "seen" delta-snapshots like the join buffers; restore groupby-maxes
    # the chain's per-hash ts marks and (TTL mode) applies the wm − ttl
    # eviction — see restore_chain.  Exact mode (ttl=None) never evicts.
    _BULKY = ("users", "tools", "seen", "cepbuf")
    _OPEN = ("sessions", "wstats", "sliding", "wtools", "meta", "pend",
             "arep", "wquant")
    # Raw-row kinds whose per-key size is horizon x rate (the only state a
    # single pathological key can blow up) — subject to the per-key cap.
    _CAPPED = ("users", "tools", "cepbuf")

    def apply_key_cap(self, cap: int) -> dict[str, int]:
        """Bound each raw-row kind to the NEWEST ``cap`` rows per conv_id;
        return per-kind dropped-row counts.

        "Newest" ranks by (ts_us, turn_idx) within the key — the SAME ts
        axis the watermark evictions use (cepbuf's sort key is turn_idx,
        where a late-but-accepted row could out-rank rows the thresholds
        later evict; ranking by ts closes that hole).  Restore-equivalent:
        a cap applied at every epoch close (after the watermark evictions)
        composes with a SINGLE cap applied after the restore chain's final
        thresholds — any row the per-epoch cap dropped was ts-older than
        >= cap rows of its key, each of which survives every later ts
        threshold the dropped row would have survived, so the end-state
        cap drops it again; a dropped row can never re-enter the tail.
        """
        dropped: dict[str, int] = {}
        for kind in self._CAPPED:
            df = self.frames[kind]
            if len(df) <= cap:
                continue
            by_ts = df.sort_values(["conv_id", "ts_us", "turn_idx"],
                                   kind="mergesort")
            tail = by_ts.groupby("conv_id", sort=False).cumcount(
                ascending=False).to_numpy() < cap
            if tail.all():
                continue
            keep = np.zeros(len(df), dtype=bool)
            keep[by_ts.index.to_numpy()[tail]] = True
            dropped[kind] = int(len(df) - tail.sum())
            # filtering the key-sorted frame preserves its sort order
            self.frames[kind] = df[keep].reset_index(drop=True)
        return dropped

    def snapshot(self, path: str, mode: str = "full",
                 delta: dict[str, pd.DataFrame] | None = None,
                 wm_after_us: int = 0) -> None:
        """Write a full or delta snapshot (one Parquet file, kind column).

        ``mode="delta"``: ``delta`` maps "users"/"tools" to the rows APPENDED
        this epoch; the open kinds still serialize full.  ``wm_after_us`` is
        stored so restore can apply the eviction thresholds without markers.
        """
        # Arrow-native assembly: per kind, reference the frame's columns
        # (no pandas copy/concat) and null-fill the superset columns typed —
        # the previous pandas path copied every bulky frame twice and built
        # len(snap)-long object arrays for each absent column (measured ~2x
        # the whole fold+emit cost per full snapshot).
        parts: list[pa.Table] = []

        def _kind_table(kind: str, df: pd.DataFrame) -> pa.Table:
            n = len(df)
            cols = {"kind": pa.array([kind] * n, pa.string())}
            for c in _SNAP_COLS[1:]:
                if c in df.columns:
                    cols[c] = pa.array(df[c].to_numpy(), type=_snap_type(c))
                else:
                    cols[c] = pa.nulls(n, _snap_type(c))
            return pa.table(cols, schema=_SNAP_SCHEMA)

        for kind, df in self.frames.items():
            if mode == "delta" and kind in self._BULKY:
                df = (delta or {}).get(kind)
                df = df[list(_EMPTY[kind].keys())] if df is not None and len(df) \
                    else _empty_frame(kind)
            if len(df) == 0:
                continue
            parts.append(_kind_table(kind, df))
        meta = pd.DataFrame({"kind": ["_snap", "_snap"],
                             "conv_id": ["type", "wm_after_us"],
                             "tool": [mode, ""],
                             "n": np.array([0, wm_after_us], dtype=np.int64)})
        parts.append(_kind_table("_snap", meta.drop(columns=["kind"])))
        snap = pa.concat_tables(parts)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        pq.write_table(snap, path)

    @classmethod
    def snapshot_mode(cls, path: str) -> str:
        """Read ONLY the snapshot's mode flag ("full"/"delta") via a
        predicate-pushdown scan of the tiny ``kind == '_snap'`` meta rows —
        the checkpoint-GC probe must not deserialize whole state files."""
        t = pq.read_table(path, columns=["kind", "conv_id", "tool"],
                          filters=[("kind", "=", "_snap")])
        df = t.to_pandas()
        row = df[df["conv_id"] == "type"]
        return str(row["tool"].iloc[0]) if len(row) else "full"

    @classmethod
    def _parse_snapshot(cls, path: str):
        snap = pq.read_table(path).to_pandas()
        frames = {}
        for kind in _EMPTY:
            sub = snap[snap["kind"] == kind]
            frames[kind] = (
                pd.DataFrame({c: sub[c].to_numpy().astype(t)
                              for c, t in _EMPTY[kind].items()})
                if len(sub) else _empty_frame(kind))
        meta = snap[snap["kind"] == "_snap"]
        mode = "full"
        wm = 0
        if len(meta):
            mode = str(meta[meta["conv_id"] == "type"]["tool"].iloc[0])
            wm = int(meta[meta["conv_id"] == "wm_after_us"]["n"].iloc[0])
        return frames, mode, wm

    @classmethod
    def restore_chain(cls, path_for_epoch, restore_epoch: int,
                      join_gap_us: int,
                      dedup_ttl_us: int | None = None,
                      cep_within_us: int | None = None,
                      max_open_rows_per_key: int | None = None,
                      ) -> "SortedStateStore":
        """Rebuild state at ``restore_epoch`` from the delta chain: walk
        snapshots backwards to the nearest full one, concat the bulky
        appends forward, apply the final watermark eviction thresholds
        (and, when configured, the per-key open-state cap — see
        :meth:`apply_key_cap` for why one end-state application equals the
        live run's per-epoch applications)."""
        store = cls()
        head = path_for_epoch(restore_epoch)
        if not os.path.exists(head):
            return store  # no state committed for this partition yet
        chain = []
        e = restore_epoch
        while e >= 0:
            p = path_for_epoch(e)
            if not os.path.exists(p):
                raise FileNotFoundError(
                    f"broken snapshot chain: missing {p} below epoch {restore_epoch}")
            frames, mode, wm = cls._parse_snapshot(p)
            chain.append(frames)
            if mode == "full":
                break
            e -= 1
        else:
            raise FileNotFoundError("snapshot chain has no full snapshot")
        chain.reverse()
        _, _, wm_last = cls._parse_snapshot(head)
        for kind in cls._OPEN:
            store.put(kind, chain[-1][kind], presorted=True)
        users = pd.concat([c["users"] for c in chain], ignore_index=True)
        tools = pd.concat([c["tools"] for c in chain], ignore_index=True)
        store.put("users", users[users["ts_us"] >= wm_last - join_gap_us])
        store.put("tools", tools[tools["ts_us"] >= wm_last])
        seen = pd.concat([c["seen"] for c in chain], ignore_index=True)
        if len(seen):
            seen = seen.groupby(["h1", "h2"], sort=False, as_index=False) \
                ["ts_us"].max()
            if dedup_ttl_us is not None:
                # mirror the live store's close-time eviction (exact because
                # ttl >= lateness makes the chain max equal the live mark)
                seen = seen[seen["ts_us"] >= wm_last - dedup_ttl_us]
        store.put("seen", seen)
        cep = pd.concat([c["cepbuf"] for c in chain], ignore_index=True)
        if cep_within_us is not None:
            # mirror the live store's close-time eviction threshold
            cep = cep[cep["ts_us"] >= wm_last - cep_within_us]
        store.put("cepbuf", cep)
        if max_open_rows_per_key is not None:
            store.apply_key_cap(max_open_rows_per_key)
        return store

    @classmethod
    def restore(cls, path: str) -> "SortedStateStore":
        """Single-snapshot restore (full snapshots only; kept for tools)."""
        store = cls()
        if not os.path.exists(path):
            return store
        frames, _, _ = cls._parse_snapshot(path)
        for kind in _EMPTY:
            if len(frames[kind]):
                store.put(kind, frames[kind], presorted=True)
        return store


def merge_sorted_append(a: pd.DataFrame, b: pd.DataFrame,
                        keys: list[str]) -> pd.DataFrame:
    """Merge two frames EACH already sorted by ``keys`` into one sorted
    frame, stable with ``a`` rows before equal ``b`` rows.

    The O(n + m·log n) sorted-run merge that replaces a full object-lexsort
    for the per-epoch state appends: the state frame ``a`` is big, the
    epoch delta ``b`` is small, and re-lexsorting ``concat(a, b)`` ignores
    that both runs are sorted (pandas factorizes the string key over all
    n + m rows every epoch).  ``keys[0]`` may be a string column (compared
    via ``np.searchsorted`` on the object array — m·log n comparisons);
    the remaining keys must be integer columns.  Extra non-key columns are
    carried through untouched.
    """
    n, m = len(a), len(b)
    if m == 0:
        return a
    if n == 0:
        return b
    a0 = a[keys[0]].to_numpy()
    b0 = b[keys[0]].to_numpy()
    # insertion index per b row: after all a rows with key <= b's (ties
    # resolve a-first = the stable order concat+mergesort produced)
    ins = np.searchsorted(a0, b0, side="right").astype(np.int64)
    if len(keys) > 1:
        lo = np.searchsorted(a0, b0, side="left").astype(np.int64)
        shared = np.flatnonzero(ins > lo)
        if len(shared):
            ak = [a[k].to_numpy(np.int64) for k in keys[1:]]
            bk = [b[k].to_numpy(np.int64) for k in keys[1:]]
            # b is key-sorted: equal-first-key rows form contiguous runs,
            # so the refinement loops once per distinct shared key value
            run_start = np.flatnonzero(
                np.r_[True, b0[shared][1:] != b0[shared][:-1]])
            bounds = np.r_[run_start, len(shared)]
            for r in range(len(run_start)):
                seg = shared[bounds[r]:bounds[r + 1]]
                s, e = int(lo[seg[0]]), int(ins[seg[0]])
                block = ak[0][s:e]
                p = np.searchsorted(block, bk[0][seg], side="right")
                if len(keys) > 2:
                    pl = np.searchsorted(block, bk[0][seg], side="left")
                    for j in np.flatnonzero(p > pl):
                        ss, ee = s + int(pl[j]), s + int(p[j])
                        p[j] = pl[j] + np.searchsorted(
                            ak[1][ss:ee], bk[1][seg[j]], side="right")
                ins[seg] = s + p
    # scatter both runs into the merged order (ins is non-decreasing
    # because b is sorted, so b's relative order is preserved)
    order = np.empty(n + m, dtype=np.int64)
    isb = np.zeros(n + m, dtype=bool)
    isb[ins + np.arange(m, dtype=np.int64)] = True
    order[isb] = n + np.arange(m, dtype=np.int64)
    order[~isb] = np.arange(n, dtype=np.int64)
    return pd.concat([a, b], ignore_index=True).take(order) \
        .reset_index(drop=True)


def merge_session_intervals(df: pd.DataFrame, gap_us: int,
                            presorted: bool = False) -> pd.DataFrame:
    """Vectorized interval merge with gap tolerance.

    ``df``: (conv_id, start_us, end_us, n) interval rows (open sessions and/or
    single-turn intervals).  Two intervals of one conv_id belong to the same
    session when ``start <= running_max(end) + gap``.  Returns merged
    (conv_id, start_us, end_us, n) — counts sum.

    ``presorted=True`` skips the (conv_id, start, end) sort — pass it when
    the frame is already in that order (the object-string lexsort is the
    dominant cost on large inputs).  Gap-merge is associative (it computes
    the connected components of the interval overlap-within-gap graph), so
    pre-merging a sorted subset and re-merging with the rest is exact.
    """
    if len(df) == 0:
        return _empty_frame("sessions")
    if not presorted:
        df = df.sort_values(["conv_id", "start_us", "end_us"], kind="mergesort")
    conv = df["conv_id"].to_numpy()
    start = df["start_us"].to_numpy(np.int64)
    end = df["end_us"].to_numpy(np.int64)
    new_conv = np.empty(len(df), dtype=bool)
    new_conv[0] = True
    new_conv[1:] = conv[1:] != conv[:-1]
    # Running max of end within conv (cython-level grouped cummax).
    g = pd.Series(end).groupby(pd.Series(conv), sort=False).cummax().to_numpy()
    prev_run = np.empty(len(df), dtype=np.int64)
    prev_run[0] = np.iinfo(np.int64).min
    prev_run[1:] = g[:-1]
    brk = new_conv | (start > prev_run + gap_us)
    sid = np.cumsum(brk)
    out = pd.DataFrame(
        {"conv_id": conv, "start_us": start, "end_us": end, "n": df["n"].to_numpy(np.int64),
         "sid": sid}
    )
    agg = out.groupby("sid", sort=True).agg(
        conv_id=("conv_id", "first"),
        start_us=("start_us", "min"),
        end_us=("end_us", "max"),
        n=("n", "sum"),
    )
    return agg.reset_index(drop=True)
