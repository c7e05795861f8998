"""Event-time windows over transcript Datasets (batch / oracle mode).

Ray Data has no native event-time windows; these stages implement the three
window kinds of the north rule as compositions of vectorized ``map_batches``
(+ partial pre-aggregation) and a single small ``groupby`` merge — the
pre-aggregate-then-merge discipline that keeps the all-to-all exchange
proportional to the number of (key, window) groups, not to the number of
turns.  Sessionization, which needs per-key ordered scans, rides the one
conversation-hash partitioning from :mod:`.partition`.

The streaming (incremental, watermark-driven) counterparts live in
:mod:`..pipelines.streaming`; both must agree with the DuckDB oracle SQL in
:mod:`..pipelines.oracles` row-for-row.

Window semantics:
- tumbling: ``window_start_us = (ts_us // size) * size``, window = [start, start+size)
- sliding:  event in every window ``k*slide`` with ``t-size < k*slide <= t``
- session:  per conv_id, a gap of strictly more than ``gap_us`` between
  consecutive turns (ts order) starts a new session.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data.aggregate import Count, Max, Min, Sum

from .partition import partitioned_map


def _ts_us(col: pa.ChunkedArray) -> np.ndarray:
    return col.cast(pa.int64()).combine_chunks().to_numpy(zero_copy_only=False)


def ts_us_series(s: pd.Series) -> np.ndarray:
    """pandas datetime series → int64 microseconds, unit-safe ([ns] or [us])."""
    return s.to_numpy().astype("datetime64[us]").astype(np.int64)


def tumbling_counts(ds, size_us: int, key: str = "conv_id"):
    """Per-(key, tumbling window) turn counts.

    map_batches partial: one row per (key, window) per batch — the shuffle
    then moves only partials (reference analog: per-page progress folded into
    per-file counters, ``watermark_processor.py:162-163,257-258``).
    """

    def partial(t: pa.Table) -> pa.Table:
        from ..config import Tumbling

        ws = Tumbling(size_us).assign(_ts_us(t["ts"]))
        df = pd.DataFrame({key: t[key].to_pandas(), "window_start_us": ws})
        g = df.groupby([key, "window_start_us"], sort=False).size().reset_index(name="partial_n")
        return pa.Table.from_pandas(g, preserve_index=False)

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    return partials.groupby([key, "window_start_us"]).aggregate(
        Sum("partial_n", alias_name="n_turns")
    )


def sliding_counts(ds, size_us: int, slide_us: int, key: str = "conv_id"):
    """Per-(key, sliding window) counts: expand each turn to its windows
    inside the batch (numpy repeat), partial-aggregate, then merge."""
    n_off = (size_us + slide_us - 1) // slide_us

    def partial(t: pa.Table) -> pa.Table:
        ts = _ts_us(t["ts"])
        k_max = ts // slide_us
        k_min = (ts - size_us) // slide_us + 1
        counts = (k_max - k_min + 1).astype(np.int64)  # == n_off except near t=0
        keys = np.repeat(np.asarray(t[key].to_pandas()), counts)
        # window index for each expanded row: k_min[i] .. k_max[i]
        offs = np.concatenate([np.arange(c) for c in counts]) if len(counts) else np.array([], np.int64)
        ws = (np.repeat(k_min, counts) + offs) * slide_us
        df = pd.DataFrame({key: keys, "window_start_us": ws})
        g = df.groupby([key, "window_start_us"], sort=False).size().reset_index(name="partial_n")
        return pa.Table.from_pandas(g, preserve_index=False)

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    out = partials.groupby([key, "window_start_us"]).aggregate(
        Sum("partial_n", alias_name="n_turns")
    )
    return out


def sessionize_pdf(df: pd.DataFrame, gap_us: int, key: str = "conv_id") -> pd.DataFrame:
    """Vectorized gaps-and-islands sessionization of one hash partition.

    Returns one row per session: (conv_id, session_start_us, session_end_us,
    n_turns).  Strictly-greater-than-gap starts a new session.
    """
    if len(df) == 0:
        return pd.DataFrame(
            {key: pd.Series([], dtype=str),
             "session_start_us": pd.Series([], dtype=np.int64),
             "session_end_us": pd.Series([], dtype=np.int64),
             "n_turns": pd.Series([], dtype=np.int64)}
        )
    df = df.sort_values([key, "ts", "turn_idx"], kind="mergesort")
    ts = ts_us_series(df["ts"])
    keys = df[key].to_numpy()
    new_key = np.empty(len(df), dtype=bool)
    new_key[0] = True
    new_key[1:] = keys[1:] != keys[:-1]
    gap_break = np.empty(len(df), dtype=bool)
    gap_break[0] = True
    gap_break[1:] = (ts[1:] - ts[:-1]) > gap_us
    session_id = np.cumsum(new_key | gap_break)
    out = pd.DataFrame({key: keys, "ts_us": ts, "sid": session_id})
    g = out.groupby("sid", sort=True)
    return pd.DataFrame(
        {
            key: g[key].first().to_numpy(),
            "session_start_us": g["ts_us"].min().to_numpy(),
            "session_end_us": g["ts_us"].max().to_numpy(),
            "n_turns": g["ts_us"].size().to_numpy(),
        }
    )


def session_labels(ds, gap_us: int, key: str = "conv_id",
                   num_partitions: int = 16):
    """Per-TURN sessionization: label every turn with its 0-based session
    ordinal within the conversation (the row→window assignment that
    :func:`session_windows` aggregates away) — the enrichment a downstream
    per-session transform joins on without re-deriving the gap logic.
    Same gaps-and-islands cumsum per hash partition; output
    ``(conv_id, turn_idx, session_id)``."""

    def label(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({key: pd.Series([], dtype=str),
                                 "turn_idx": pd.Series([], dtype=np.int32),
                                 "session_id": pd.Series([], dtype=np.int64)})
        df = df.sort_values([key, "ts", "turn_idx"], kind="mergesort")
        ts = ts_us_series(df["ts"])
        keys = df[key].to_numpy()
        new_key = np.empty(len(df), dtype=bool)
        new_key[0] = True
        new_key[1:] = keys[1:] != keys[:-1]
        gap_break = np.empty(len(df), dtype=bool)
        gap_break[0] = False
        gap_break[1:] = ((ts[1:] - ts[:-1]) > gap_us) & ~new_key[1:]
        # per-conv 0-based ordinal: cumsum of breaks minus the value carried
        # at each conversation start
        run = np.cumsum(gap_break)
        base = pd.Series(np.where(new_key, run, 0)) \
            .cummax().to_numpy()  # run value at this conv's first row
        return pd.DataFrame({key: keys,
                             "turn_idx": df["turn_idx"].to_numpy(np.int32),
                             "session_id": (run - base).astype(np.int64)})

    return partitioned_map(ds, label, key=key, num_partitions=num_partitions)


def session_windows(ds, gap_us: int, key: str = "conv_id", num_partitions: int = 16,
                    hot_keys: tuple[str, ...] = ()):
    """Session windows per key: one conv-hash shuffle, vectorized per-partition
    sessionize (SURVEY.md §2.6 A4 / north-rule session windows).  ``hot_keys``
    route to reserved partitions (batch twin of the streaming skew routing)."""
    return partitioned_map(
        ds, lambda g: sessionize_pdf(g, gap_us, key), key=key,
        num_partitions=num_partitions, hot_keys=hot_keys
    )


def windowed_stats(ds, size_us: int, key: str, value_col: str):
    """Tumbling-window numeric aggregate (count / sum / min / max of a value
    column) — generic windowed reduction used by the events pipeline.

    Count/sum/min/max all decompose, so each batch pre-aggregates to one row
    per (key, window) and the shuffle moves partials, not events."""

    def partial(t: pa.Table) -> pa.Table:
        ws = (_ts_us(t["ts"]) // size_us) * size_us
        df = pd.DataFrame({key: t[key].to_pandas(), "window_start_us": ws,
                           "v": t[value_col].to_pandas()})
        g = df.groupby([key, "window_start_us"], sort=False).agg(
            partial_n=("v", "size"), partial_sum=("v", "sum"),
            partial_min=("v", "min"), partial_max=("v", "max")).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    return partials.groupby([key, "window_start_us"]).aggregate(
        Sum("partial_n", alias_name="n"),
        Sum("partial_sum", alias_name="sum_value"),
        Min("partial_min", alias_name="min_value"),
        Max("partial_max", alias_name="max_value"),
    )


def wtopk_project(counts: pd.DataFrame, k: int) -> pd.DataFrame:
    """Top-k tools per (conv_id, window_start_us) from a per-tool count
    table: n desc, tool asc tie-break, dense 1-based rank.

    The ONE place the ranking rule lives — the streaming engine's wtopk
    close and the single-process replay oracle both call this, so a
    tie-break tweak cannot drift between them."""
    out = counts.sort_values(["conv_id", "window_start_us", "n", "tool"],
                             ascending=[True, True, False, True],
                             kind="mergesort")
    out = out.groupby(["conv_id", "window_start_us"], sort=False) \
        .head(k).copy()
    out["rank"] = (out.groupby(["conv_id", "window_start_us"], sort=False)
                   .cumcount().to_numpy() + 1).astype(np.int64)
    return out[["conv_id", "window_start_us", "tool", "n", "rank"]]
