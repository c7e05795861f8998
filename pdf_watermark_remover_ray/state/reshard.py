"""Elastic rescale of a streaming checkpoint — resume into a DIFFERENT
partition count (the Flink "rescale from savepoint" capability; public
pattern: Carbone et al., "State Management in Apache Flink", VLDB 2017).

A checkpoint's keyed state is sharded by ``stable_hash(conv_id) % P``
(plus reserved hot-key partitions) for the conversation-keyed kinds and by
``h1 % P`` for the dedup seen-set; changing ``P`` between runs therefore
changes the key→partition routing, and a naive resume would split every
key's state from its future rows.  The engine refuses that with a
persisted partition-layout guard (``_layout.json``); this module performs
the sanctioned path:

1. rebuild every OLD partition's state at the last committed epoch via the
   normal delta-chain restore,
2. re-split every state kind by the NEW routing (the same
   ``partition_table`` / ``h1 % P`` expressions the routers use — a key's
   new home is exactly where future rows will land),
3. write one FULL snapshot per NEW partition into a fresh
   ``_state/reshard-…`` directory, and
4. atomically commit the new layout by replacing ``_layout.json`` — the
   single commit point.  A crash anywhere before step 4 leaves the old
   chain untouched (resharded files are invisible until the layout names
   them), so re-running the reshard is always safe.

Scale note: this driver-side implementation concatenates per-partition
state (NOT the stream itself — state is bounded by open windows + the
horizon-bounded buffers).  At 10^12-turn scale the identical split is a
Dataset map over the snapshot files (they are plain Parquet); the protocol
— full per-partition snapshots + atomic layout commit — is the part that
matters and is what is tested.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa

from ..sinks.parquet import EpochSink
from ..stages.partition import partition_table
from .store import _EMPTY, SortedStateStore

LAYOUT_FILE = "_layout.json"


def layout_of(cfg) -> dict:
    return {"num_partitions": cfg.num_partitions,
            "hot_keys": list(cfg.hot_keys),
            "emit_streams": sorted(cfg.emit_streams)
            if cfg.emit_streams is not None else None,
            "wquant_ps": list(cfg.wquant_ps)
            if cfg.wquant_ps is not None else None,
            "enrich_stream": bool(cfg.enrich_stream),
            "enrich_dim": [list(d) for d in cfg.enrich_dim],
            "dedup_hash": _dedup_hash_family(),
            "reshard": None}


def _dedup_hash_family() -> str:
    """Which text-hash family the dedup seen-set uses (streaming
    `_dedup_hashes`): polars' seeded row hash when polars is importable,
    the keyed pandas siphash pair otherwise.  Recorded in the layout so a
    resume chain cannot silently switch families mid-chain — hashes
    snapshotted under one family would never match re-hashes under the
    other, un-deduplicating every pre-switch text."""
    try:
        import polars  # noqa: F401

        return "polars-seeded-v1"
    except ImportError:
        return "pandas-siphash-v1"


def read_layout(out_dir: str) -> dict | None:
    path = os.path.join(out_dir, LAYOUT_FILE)
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)


def write_layout(out_dir: str, layout: dict) -> None:
    path = os.path.join(out_dir, LAYOUT_FILE)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(layout, f)
    os.replace(tmp, path)  # atomic: THE reshard commit point


def layout_matches(layout: dict, cfg) -> bool:
    """Partition layout AND stream-set compatibility: a disabled stream's
    state kinds stay empty, so flipping a stream on mid-chain would emit
    from missing state — the guard refuses it like a partition-count
    change.  Keys absent from an old checkpoint's layout are unknown and
    accepted (additive guard evolution)."""
    if (layout["num_partitions"] != cfg.num_partitions
            or list(layout["hot_keys"]) != list(cfg.hot_keys)):
        return False
    if "emit_streams" in layout:
        want = sorted(cfg.emit_streams) if cfg.emit_streams is not None \
            else None
        if layout["emit_streams"] != want:
            return False
    if "wquant_ps" in layout:
        want = list(cfg.wquant_ps) if cfg.wquant_ps is not None else None
        if layout["wquant_ps"] != want:
            return False
    if "enrich_stream" in layout:
        if layout["enrich_stream"] != bool(cfg.enrich_stream):
            return False
    if "enrich_dim" in layout:
        if layout["enrich_dim"] != [list(d) for d in cfg.enrich_dim]:
            return False
    if "dedup_hash" in layout:
        if layout["dedup_hash"] != _dedup_hash_family():
            return False
    return True


def checkpoint_state_path(sink: EpochSink, layout: dict | None,
                          epoch: int, pid: int) -> str:
    """Path of partition ``pid``'s state snapshot for ``epoch`` under
    ``layout`` — the resharded FULL snapshot when the layout records a
    reshard at exactly that epoch, the normal committed path otherwise.
    (The reshard snapshot is always mode="full", so a delta-chain walk
    stops there and never crosses into pre-reshard routing.)"""
    rs = (layout or {}).get("reshard")
    if rs and rs["epoch"] == epoch:
        return os.path.join(sink.out_dir, "_state", rs["dir"],
                            f"part-{pid}.parquet")
    return sink.state_path(epoch, pid)


def reshard_checkpoint(out_dir: str, old_cfg, new_cfg) -> dict:
    """Re-split the checkpoint at the last committed epoch from
    ``old_cfg``'s partition layout to ``new_cfg``'s (partition count and/or
    hot-key set may change).  Returns a summary; after it commits, a
    StreamingEngine constructed with ``new_cfg`` resumes normally."""
    sink = EpochSink(out_dir)
    e = sink.last_contiguous_epoch()
    if e < 0:
        raise ValueError("reshard_checkpoint: no committed epoch to reshard")
    layout = read_layout(out_dir)
    if layout is not None and not layout_matches(layout, old_cfg):
        raise ValueError(
            f"reshard_checkpoint: old_cfg layout (P={old_cfg.num_partitions}, "
            f"hot={list(old_cfg.hot_keys)}) does not match the checkpoint's "
            f"_layout.json (P={layout['num_partitions']}, "
            f"hot={layout['hot_keys']})")
    wm = int(sink.read_marker(e)["watermark_us"])

    stores = [
        SortedStateStore.restore_chain(
            (lambda pid: lambda ep: checkpoint_state_path(sink, layout, ep,
                                                          pid))(p),
            e, old_cfg.join_gap_us, dedup_ttl_us=old_cfg.dedup_ttl_us,
            cep_within_us=old_cfg.cep_within_us,
            max_open_rows_per_key=old_cfg.max_open_rows_per_key)
        for p in range(old_cfg.total_partitions)
    ]

    new_total = new_cfg.total_partitions
    new_stores = [SortedStateStore() for _ in range(new_total)]
    moved: dict[str, int] = {}
    for kind in _EMPTY:
        df = pd.concat([s.get(kind) for s in stores], ignore_index=True)
        if kind == "meta":
            # watermark-derived scalar state (identical across partitions by
            # construction): keep the max per key, replicate to every new one
            if len(df):
                df = df.groupby("conv_id", as_index=False)["n"].max()
                for st in new_stores:
                    st.put("meta", df, presorted=True)
            moved[kind] = int(len(df))
            continue
        moved[kind] = int(len(df))
        if not len(df):
            continue
        if kind == "seen":  # dedup keyspace routes by text hash, no hot keys
            q_arr = (df["h1"].to_numpy(np.int64)
                     % new_cfg.num_partitions).astype(np.int64)
        else:
            q_arr = partition_table(
                pa.Table.from_pandas(df[["conv_id"]], preserve_index=False),
                "conv_id", new_cfg.num_partitions,
                hot_keys=new_cfg.hot_keys).astype(np.int64)
        for q in np.unique(q_arr):
            new_stores[int(q)].put(kind, df[q_arr == q])

    rdir = f"reshard-e{e}-p{new_total}"
    absdir = os.path.join(out_dir, "_state", rdir)
    os.makedirs(absdir, exist_ok=True)
    for q, st in enumerate(new_stores):
        st.snapshot(os.path.join(absdir, f"part-{q}.parquet"),
                    mode="full", wm_after_us=wm)
    new_layout = layout_of(new_cfg)
    new_layout["reshard"] = {"epoch": e, "dir": rdir}
    write_layout(out_dir, new_layout)
    return {"epoch": e, "old_total": old_cfg.total_partitions,
            "new_total": new_total, "rows_moved": moved, "dir": rdir}
