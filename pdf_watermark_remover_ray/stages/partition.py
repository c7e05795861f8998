"""Explicit hash partitioning by conversation key.

The reference processes one document at a time in a single thread
(``ui/app_ui.py:374-375``); the engine's unit of co-location is the
conversation.  ONE partitioning key (``hash(conv_id) % P``) is chosen and
reused across sessionization, joins and stateful streaming so the shuffle
happens once and every keyed stage sees all rows of a key (SURVEY.md §7.3).

``groupby("part").map_groups`` with P partition-groups keeps the per-group
Python overhead at O(P) — each group is a whole hash partition processed with
vectorized pandas/numpy, NOT one group per conversation (which would pay
per-key function-call overhead at 10^9 keys).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def stable_hash(series: pd.Series) -> np.ndarray:
    """Deterministic, process-independent uint64 hash of a key column.

    pandas' vectorized siphash with its fixed default key — stable across
    workers and across driver restarts, which the epoch/state routing needs
    (SURVEY.md §7.4 "Stable partition→state affinity across epochs").
    """
    return pd.util.hash_pandas_object(series, index=False).to_numpy()


def add_partition_column(ds, key: str = "conv_id", num_partitions: int = 16,
                         col: str = "part", hot_keys: tuple[str, ...] = ()):
    """Append ``part = stable_hash(key) % P`` (vectorized, Arrow in/out).
    Keys in ``hot_keys`` route to reserved partitions ``P + i`` — same
    skew isolation as the streaming router (:func:`partition_table`)."""

    def add_part(t: pa.Table) -> pa.Table:
        part = partition_table(t, key, num_partitions, hot_keys=hot_keys)
        return t.append_column(col, pa.array(part.astype(np.int32)))

    return ds.map_batches(add_part, batch_format="pyarrow", zero_copy_batch=True)


def partitioned_map(ds, fn, key: str = "conv_id", num_partitions: int = 16,
                    hot_keys: tuple[str, ...] = ()):
    """Hash-partition by ``key`` then run ``fn`` (pandas→pandas, vectorized)
    once per partition with all rows of each key co-located.  ``hot_keys``
    (e.g. from :func:`detect_hot_keys`) each get a RESERVED partition, so a
    heavy key never contends with its hash bucket — isolation, not salting:
    per-key-coherent operators (sessionize, CEP, ordered dedup) cannot have
    their key split without breaking semantics, so the knob a planner has is
    where the whole key lives."""
    ds = add_partition_column(ds, key=key, num_partitions=num_partitions,
                              hot_keys=hot_keys)
    return ds.groupby("part").map_groups(fn, batch_format="pandas")


def partition_table(table: pa.Table, key: str, num_partitions: int,
                    hot_keys: tuple[str, ...] = ()) -> np.ndarray:
    """Partition ids for an in-memory Arrow table (streaming router path).

    Keys in ``hot_keys`` are routed to reserved partitions
    ``num_partitions + index`` — one dedicated state partition per hot key,
    so a heavy conversation never contends with the rest of its hash bucket
    (and is never salted, which would split its session/join state)."""
    s = table[key].to_pandas()
    part = (stable_hash(s) % num_partitions).astype(np.int32)
    for i, k in enumerate(hot_keys):
        part[(s == k).to_numpy()] = num_partitions + i
    return part


def detect_hot_keys(ds, key: str = "conv_id", frac_threshold: float = 0.05,
                    max_keys: int = 8) -> tuple[str, ...]:
    """Plan-time hot-key detection: keys holding more than ``frac_threshold``
    of all rows (partial per-batch counts → one small groupby merge).
    Returns up to ``max_keys`` hottest keys, deterministic order (count desc,
    key asc)."""
    import pandas as pd_

    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        g = t[key].to_pandas().value_counts()
        return pa.table({key: g.index.astype(str), "partial_n": g.to_numpy()})

    counts = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(key)
        .aggregate(Sum("partial_n", alias_name="n"))
        .to_pandas()
    )
    total = counts["n"].sum()
    if total == 0:
        return ()
    hot = counts[counts["n"] > total * frac_threshold]
    hot = hot.sort_values(["n", key], ascending=[False, True]).head(max_keys)
    return tuple(hot[key].tolist())
