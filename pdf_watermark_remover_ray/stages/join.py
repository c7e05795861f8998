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


ASOF_OUT_META = ("lag_us",)


def asof_join_tables(left_ds, right_ds, *, key: str, left_cols: list,
                     right_cols: list, right_tie: str,
                     num_partitions: int = 16, direction: str = "backward"):
    """Generic keyed as-of join of TWO independent Datasets (the third
    custom-join class the Dataset API lacks; stream_join/range_join co-locate
    one stream).  ``direction="backward"`` (default): each left row matches
    the single right row of the same ``key`` with the largest ``ts_us <=
    left.ts_us``; ties on equal right ``ts_us`` resolve to the largest
    ``right_tie`` (merge_asof takes the last row in sort order — the oracle
    mirrors with ORDER BY ts DESC, tie DESC).  ``direction="forward"``: the
    smallest ``ts_us >= left.ts_us``, ties to the SMALLEST ``right_tie``
    (merge_asof takes the first row in sort order — oracle ORDER BY ts ASC,
    tie ASC); ``lag_us`` is then ``matched right.ts_us − left.ts_us`` so it
    stays non-negative in both directions.
    Unmatched left rows drop (inner asof).

    Both inputs must already be projected to ``[key, ts_us(int64), *cols]``.
    Topology: tag side → union into one unified schema → ONE key-hash
    shuffle → per-partition vectorized ``pandas.merge_asof``.  At 10^12 rows
    this moves each side exactly once, co-partitioned by the shared key, and
    the per-partition join is O(n log n) local sort — no driver
    materialization, no all-pairs.  Output: ``key, *left_cols, *right_cols,
    lag_us`` (lag = left.ts_us − matched right.ts_us).
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    from .partition import add_partition_column

    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    all_cols = list(left_cols) + list(right_cols)

    def unify(side: int, own: list):
        # ARROW blocks out: pandas blocks would drop the union+groupby
        # shuffle into Ray's row-wise object-comparison sort path (~100×)
        def fn(t: pa.Table) -> pa.Table:
            n = len(t)
            cols = {key: t[key], "ts_us": t["ts_us"].cast(pa.int64()),
                    "side": pa.array(np.full(n, side, np.int8))}
            for c in all_cols:
                cols[c] = t[c].cast(pa.int64()) if c in own \
                    else pa.nulls(n, pa.int64())
            return pa.table(cols)
        return fn

    u = left_ds.map_batches(unify(0, left_cols), batch_format="pyarrow",
                            zero_copy_batch=True) \
        .union(right_ds.map_batches(unify(1, right_cols),
                                    batch_format="pyarrow",
                                    zero_copy_batch=True))

    # payload columns ride through pandas as nullable Int64 (NOT float64 —
    # the union's null promotion would otherwise round-trip int64 payloads
    # through float64 and silently corrupt values ≥ 2^53)
    _TYPES = {pa.int64(): pd.Int64Dtype()}

    def join_part(t: pa.Table) -> pa.Table:
        def empty() -> pa.Table:
            return pa.table(
                {key: pa.array([], t.schema.field(key).type),
                 **{c: pa.array([], pa.int64()) for c in all_cols},
                 "lag_us": pa.array([], pa.int64())})

        l = t.filter(pc.equal(t["side"], 0)) \
            .select([key, "ts_us"] + left_cols).to_pandas(
                types_mapper=_TYPES.get)
        r = t.filter(pc.equal(t["side"], 1)) \
            .select([key, "ts_us"] + right_cols).to_pandas(
                types_mapper=_TYPES.get)
        if l.empty or r.empty:
            return empty()
        # merge_asof's "on" key must be a plain numpy dtype; it is never
        # null (both sides project a real timestamp), so the cast is exact
        l["ts_us"] = l["ts_us"].astype(np.int64)
        r["ts_us"] = r["ts_us"].astype(np.int64)
        l = l.sort_values("ts_us", kind="mergesort")[[key, "ts_us"] + left_cols]
        r = r.sort_values(["ts_us", right_tie], kind="mergesort")[
            [key, "ts_us"] + right_cols].rename(columns={"ts_us": "r_ts_us"})
        m = pd.merge_asof(l, r, left_on="ts_us", right_on="r_ts_us", by=key,
                          direction=direction)
        m = m.dropna(subset=[right_tie])
        if m.empty:
            return empty()
        cols = {key: pa.Array.from_pandas(m[key])}
        for c in all_cols:
            # Int64 extension → arrow int64 (nulls preserved, values exact)
            cols[c] = pa.Array.from_pandas(m[c]).cast(pa.int64())
        lag = (m["ts_us"].to_numpy(np.int64)
               - m["r_ts_us"].to_numpy(np.int64))
        cols["lag_us"] = pa.array(-lag if direction == "forward" else lag)
        return pa.table(cols)

    u = add_partition_column(u, key=key, num_partitions=num_partitions)
    return u.groupby("part").map_groups(join_part, batch_format="pyarrow")
