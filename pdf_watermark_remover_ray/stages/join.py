"""Stream-stream join: user turns ⋈ tool-call turns within a session gap.

The reference has no joins (SURVEY.md §2.5) — this is the north-rule-added
operator J1.  Semantics: for every ``role == 'tool'`` turn, match the most
recent ``role == 'user'`` turn of the same conversation with
``user.ts <= tool.ts`` and ``tool.ts - user.ts <= gap_us``; emit
``(conv_id, user_turn_idx, tool_turn_idx, tool, dt_us)``.  Ties on equal
user ``ts`` resolve to the largest ``turn_idx`` (merge_asof takes the last
row in (ts, turn_idx) sort order); the oracle SQL mirrors that tiebreak.

Batch implementation: ONE conversation-hash shuffle (shared key partitioning,
SURVEY.md §7.3), then a vectorized ``pandas.merge_asof`` per hash partition —
both sides of one conversation are co-located by construction, so the join is
partition-local.  The incremental/watermark-driven version keeps the same
per-key buffers inside the state actors (:mod:`..pipelines.streaming`).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .partition import partitioned_map

JOIN_OUT_COLS = ["conv_id", "user_turn_idx", "tool_turn_idx", "tool", "dt_us"]


def join_pdf(df: pd.DataFrame, gap_us: int) -> pd.DataFrame:
    """Vectorized user⋈tool asof-join of one hash partition."""
    empty = pd.DataFrame(
        {
            "conv_id": pd.Series([], dtype=str),
            "user_turn_idx": pd.Series([], dtype=np.int32),
            "tool_turn_idx": pd.Series([], dtype=np.int32),
            "tool": pd.Series([], dtype=str),
            "dt_us": pd.Series([], dtype=np.int64),
        }
    )
    users = df[df["role"] == "user"]
    tools = df[df["role"] == "tool"]
    if users.empty or tools.empty:
        return empty
    users = users.sort_values(["ts", "turn_idx"], kind="mergesort")[
        ["conv_id", "turn_idx", "ts"]
    ].rename(columns={"turn_idx": "user_turn_idx"})
    tools = tools.sort_values(["ts", "turn_idx"], kind="mergesort")[
        ["conv_id", "turn_idx", "tool", "ts"]
    ].rename(columns={"turn_idx": "tool_turn_idx"})
    merged = pd.merge_asof(
        tools,
        users,
        on="ts",
        by="conv_id",
        direction="backward",
        tolerance=pd.Timedelta(gap_us, unit="us"),
        suffixes=("", "_u"),
    )
    # merge_asof keeps user ts only via the suffix-less right cols; recompute dt.
    matched = merged.dropna(subset=["user_turn_idx"])
    if matched.empty:
        return empty
    # Recover user ts for dt: asof merged only turn_idx; re-join on keys.
    users_ts = users.rename(columns={"ts": "user_ts"})
    matched = matched.merge(users_ts, on=["conv_id", "user_turn_idx"], how="left")
    from .windows import ts_us_series

    dt = ts_us_series(matched["ts"]) - ts_us_series(matched["user_ts"])
    return pd.DataFrame(
        {
            "conv_id": matched["conv_id"].to_numpy(),
            "user_turn_idx": matched["user_turn_idx"].astype(np.int32).to_numpy(),
            "tool_turn_idx": matched["tool_turn_idx"].astype(np.int32).to_numpy(),
            "tool": matched["tool"].to_numpy(),
            "dt_us": dt,
        }
    )


def stream_join(ds, gap_us: int, num_partitions: int = 16):
    """user⋈tool join over a transcript Dataset (batch / oracle mode)."""
    return partitioned_map(
        ds, lambda g: join_pdf(g, gap_us), key="conv_id", num_partitions=num_partitions
    )


def range_join(ds, gap_us: int, num_partitions: int = 16):
    """1:N RANGE join: EVERY (user, tool) turn pair of one conversation with
    ``user.ts <= tool.ts <= user.ts + gap_us`` — the as-of join's
    all-matches sibling (an interval/range join, the second custom-join
    class the Dataset API lacks).

    Same single conversation-hash shuffle; within a partition the pair
    enumeration is a per-conversation equi-merge then a vectorized time
    filter.  The intermediate is the per-conv user×tool cross product —
    bounded by conversation length (turn counts per conv are small by
    construction; hot conversations route to reserved partitions), NEVER by
    partition size.  Output: ``(conv_id, user_turn_idx, tool_turn_idx, tool,
    dt_us)``, one row per qualifying pair."""

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        from .windows import ts_us_series

        users = df[df["role"] == "user"]
        tools = df[df["role"] == "tool"]
        if users.empty or tools.empty:
            return pd.DataFrame(
                {"conv_id": pd.Series([], dtype=str),
                 "user_turn_idx": pd.Series([], dtype=np.int32),
                 "tool_turn_idx": pd.Series([], dtype=np.int32),
                 "tool": pd.Series([], dtype=str),
                 "dt_us": pd.Series([], dtype=np.int64)})
        u = pd.DataFrame({"conv_id": users["conv_id"].to_numpy(),
                          "user_turn_idx": users["turn_idx"].to_numpy(np.int32),
                          "u_ts": ts_us_series(users["ts"])})
        t = pd.DataFrame({"conv_id": tools["conv_id"].to_numpy(),
                          "tool_turn_idx": tools["turn_idx"].to_numpy(np.int32),
                          "tool": tools["tool"].to_numpy(),
                          "t_ts": ts_us_series(tools["ts"])})
        m = u.merge(t, on="conv_id")  # per-conv cross product (bounded)
        dt = m["t_ts"].to_numpy(np.int64) - m["u_ts"].to_numpy(np.int64)
        keep = (dt >= 0) & (dt <= gap_us)
        m = m[keep]
        return pd.DataFrame({
            "conv_id": m["conv_id"].to_numpy(),
            "user_turn_idx": m["user_turn_idx"].to_numpy(np.int32),
            "tool_turn_idx": m["tool_turn_idx"].to_numpy(np.int32),
            "tool": m["tool"].to_numpy(),
            "dt_us": dt[keep],
        })

    return partitioned_map(ds, pairs, key="conv_id",
                           num_partitions=num_partitions)
