"""Resumable partitioned BATCH sink (the batch counterpart of
:mod:`.parquet`'s epoch sink, and the "resumable output" discipline a
100 TB run needs: one directory per key partition, a write-once ``_SUCCESS``
marker per partition, and a resume that SKIPS finished partitions entirely).

Layout::

    out/
      {by}={value}/part-00000.parquet   (hive-style, prunable at read)
      {by}={value}/_SUCCESS             (the commit point, written LAST)

Write topology: distinct keys come from a tiny per-batch-partial aggregate;
already-committed keys are dropped BEFORE the shuffle (a resumed run moves
only the unfinished partitions' rows); each pending partition is then one
``groupby(by).map_groups`` task that writes its own directory — staging file
→ ``os.replace`` → marker, so a crash mid-write never leaves a partition
that claims to be complete.  Readers prune physically: only the requested
``{by}={value}`` directories are opened.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import ray
import ray.data


def _part_dir(out_dir: str, by: str, value) -> str:
    return os.path.join(out_dir, f"{by}={value}")


def _marker(out_dir: str, by: str, value) -> str:
    return os.path.join(_part_dir(out_dir, by, value), "_SUCCESS")


def committed_keys(out_dir: str, by: str) -> set:
    """Keys whose partition directory carries the ``_SUCCESS`` marker."""
    if not os.path.isdir(out_dir):
        return set()
    out = set()
    prefix = f"{by}="
    for name in os.listdir(out_dir):
        if name.startswith(prefix) and \
                os.path.exists(os.path.join(out_dir, name, "_SUCCESS")):
            out.add(name[len(prefix):])
    return out


def write_partitioned(ds, out_dir: str, by: str = "lang") -> dict:
    """Write ``ds`` as hive-partitioned parquet with per-partition commit
    markers; SKIP partitions already committed (resume).  ``by`` values are
    coalesced to ``""`` (null-safe, matches the samplers' convention) and
    rendered into directory names — callers with arbitrary-string keys
    should pre-sanitize.  Returns ``{key: rows_written}`` for THIS run
    (committed-and-skipped partitions are absent)."""
    from ray.data.aggregate import Sum

    os.makedirs(out_dir, exist_ok=True)
    done = committed_keys(out_dir, by)

    def key_partial(df: pd.DataFrame) -> pd.DataFrame:
        vc = df[by].fillna("").value_counts()
        return pd.DataFrame({by: vc.index.astype(str),
                             "partial_n": vc.to_numpy(np.int64)})

    keys = ds.map_batches(key_partial, batch_format="pandas") \
        .groupby(by).aggregate(Sum("partial_n", alias_name="n")).to_pandas()
    pending = sorted(set(keys[by].astype(str)) - done)
    if not pending:
        return {}
    pending_set = set(pending)

    def drop_done(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df[by] = df[by].fillna("")
        return df[df[by].astype(str).isin(pending_set)]

    ds = ds.map_batches(drop_done, batch_format="pandas")

    def write_group(df: pd.DataFrame) -> pd.DataFrame:
        value = str(df[by].iloc[0])
        d = _part_dir(out_dir, by, value)
        os.makedirs(d, exist_ok=True)
        final = os.path.join(d, "part-00000.parquet")
        staging = final + ".staging"
        pq.write_table(pa.Table.from_pandas(df, preserve_index=False), staging)
        os.replace(staging, final)
        with open(_marker(out_dir, by, value), "w") as f:
            f.write("")  # marker IS the commit point, written last
        return pd.DataFrame({by: [value], "rows": [np.int64(len(df))]})

    written = ds.groupby(by).map_groups(write_group, batch_format="pandas") \
        .to_pandas()
    if not len(written.columns):
        return {}
    return dict(zip(written[by].astype(str), written["rows"].astype(int)))


def read_partitioned(out_dir: str, by: str, values=None):
    """Read back with PHYSICAL pruning: only the requested ``{by}={value}``
    directories' files are opened (none of the others' bytes move).  Only
    committed partitions are visible — an uncommitted (crashed) partition
    directory is ignored."""
    keys = sorted(committed_keys(out_dir, by))
    if values is not None:
        want = {str(v) for v in values}
        keys = [k for k in keys if k in want]
    files = [os.path.join(_part_dir(out_dir, by, k), "part-00000.parquet")
             for k in keys]
    if not files:
        raise FileNotFoundError(
            f"no committed partitions for {by} in {out_dir}")
    return ray.data.read_parquet(files)
