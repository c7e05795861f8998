"""Mergeable sketches (engine-added; the reference has none — SURVEY.md §2.6).

KMV (k-minimum-values) approximate-distinct: per batch, keep the k smallest
64-bit hashes of the values per group; sketches merge by union + re-truncate
(the canonical mergeable-sketch shape: partial per batch inside
``map_batches``, one tiny ``groupby`` merge — the shuffle moves k hashes per
(group, batch), never the values).  Estimate: ``(k-1) / max_kth_normalized``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

_K = 256
_U64_MAX = float(1 << 64)


def _kmv_partial(values: pd.Series, k: int = _K) -> np.ndarray:
    h = pd.util.hash_pandas_object(values, index=False).to_numpy()
    h = np.unique(h)
    return h[:k] if len(h) <= k else np.partition(h, k - 1)[:k]


def _kmv_estimate(hashes: np.ndarray, k: int = _K) -> float:
    hashes = np.unique(hashes)
    if len(hashes) < k:
        return float(len(hashes))  # exact below k
    kth = np.partition(hashes, k - 1)[k - 1]
    return (k - 1) / (float(kth) / _U64_MAX)


def approx_distinct(ds, group_col: str, value_col: str, k: int = _K) -> pd.DataFrame:
    """Approximate count-distinct of ``value_col`` per ``group_col``.

    map_batches partial sketches → driver-side merge of the (tiny) sketch
    rows.  Returns (group, approx_distinct) with ``approx_distinct`` exact
    whenever the true cardinality is below k."""

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({group_col: t[group_col].to_pandas(),
                           value_col: t[value_col].to_pandas()})
        rows = []
        for g, sub in df.groupby(group_col, sort=False):
            for h in _kmv_partial(sub[value_col], k):
                rows.append((g, np.int64(h.astype(np.int64))))
        out = pd.DataFrame(rows, columns=[group_col, "h"]) if rows else \
            pd.DataFrame({group_col: pd.Series([], dtype=str),
                          "h": pd.Series([], dtype=np.int64)})
        return pa.Table.from_pandas(out, preserve_index=False)

    sketches = ds.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True).to_pandas()
    rows = []
    for g, sub in sketches.groupby(group_col, sort=True):
        est = _kmv_estimate(sub["h"].to_numpy().astype(np.uint64), k)
        rows.append((g, round(est, 1)))
    return pd.DataFrame(rows, columns=[group_col, "approx_distinct"])


def approx_distinct_users(sf_dir: str) -> pd.DataFrame:
    """Approximate distinct user_id per event_type over the events table."""
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_type", "user_id"])
    return approx_distinct(ds, "event_type", "user_id")
