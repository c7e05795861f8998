"""Mergeable sketches (engine-added; the reference has none — SURVEY.md §2.6).

KMV (k-minimum-values) approximate-distinct: per batch, keep the k smallest
64-bit hashes of the values per group; sketches merge by union + re-truncate
(the canonical mergeable-sketch shape: partial per batch inside
``map_batches``, one tiny ``groupby`` merge — the shuffle moves k hashes per
(group, batch), never the values).  Estimate: ``(k-1) / max_kth_normalized``.

The value hash is the first 8 bytes of ``md5(str(value))`` — deliberately
reproducible in ANSI SQL (``('0x' || substring(md5(v), 1, 16))::UBIGINT``) so
the DuckDB oracle checks the estimate EXACTLY, not just within error bounds.
md5 runs only over the per-batch distinct (group, value) pairs, so its cost
is bounded by batch cardinality, not row count.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from .hashing import md5_u64
from .rounding import round_half_away

_K = 256
_U64_MAX = float(1 << 64)


def _md5_u64(values: pd.Series) -> np.ndarray:
    """First 8 bytes of md5(str(v)) as uint64 (big-endian hex prefix)."""
    return md5_u64([str(v) for v in values])


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
        # distinct (group, value) first → md5 cost is per-distinct, then a
        # fully vectorized per-group k-smallest (sort + grouped head).
        df = df.drop_duplicates()
        df = pd.DataFrame({group_col: df[group_col].to_numpy(),
                           "h": _md5_u64(df[value_col])})
        df = df.drop_duplicates().sort_values([group_col, "h"], kind="mergesort")
        out = df.groupby(group_col, sort=False).head(k)
        return pa.Table.from_pandas(out, preserve_index=False)

    sketches = ds.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True).to_pandas()
    rows = []
    for g, sub in sketches.groupby(group_col, sort=True):
        est = _kmv_estimate(sub["h"].to_numpy().astype(np.uint64), k)
        rows.append((g, float(round_half_away(est, 1))))
    return pd.DataFrame(rows, columns=[group_col, "approx_distinct"])


def approx_distinct_users(sf_dir: str, k: int = 64) -> pd.DataFrame:
    """Approximate distinct user_id per event_type over the events table.

    k=64 (not the library default 256) so the estimator path — not just the
    exact-below-k path — is exercised against the oracle at sf0.01, where
    true cardinalities are ~150 per group."""
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_type", "user_id"])
    return approx_distinct(ds, "event_type", "user_id", k=k)


def kmv_oracle_sql(group_col: str = "event_type", value_col: str = "user_id",
                   table: str = "events", k: int = _K) -> str:
    """The DuckDB mirror of :func:`approx_distinct`: same md5-prefix hash,
    same distinct-hash set, same (k-1)/normalized-kth estimate."""
    return f"""
        WITH hashed AS (
            SELECT DISTINCT {group_col},
                   ('0x' || substring(md5(CAST({value_col} AS VARCHAR)), 1, 16))::UBIGINT AS h
            FROM {table}),
        ranked AS (
            SELECT {group_col}, h,
                   row_number() OVER (PARTITION BY {group_col} ORDER BY h) AS rn,
                   count(*) OVER (PARTITION BY {group_col}) AS nd
            FROM hashed)
        SELECT {group_col},
               round(CASE WHEN nd < {k} THEN CAST(nd AS DOUBLE)
                          ELSE ({k} - 1) / (CAST(h AS DOUBLE) / 18446744073709551616.0)
                     END, 1) AS approx_distinct
        FROM ranked
        WHERE rn = least({k}, nd)"""
