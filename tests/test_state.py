"""Incremental (delta) state snapshots: exact chain restore + size scaling."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

from pdf_watermark_remover_ray.state.store import SortedStateStore

GAP = 100


def _users(conv, ts):
    return pd.DataFrame({"conv_id": conv, "ts_us": np.array(ts, np.int64),
                         "turn_idx": np.arange(len(ts), dtype=np.int32)})


def _tools(conv, ts):
    return pd.DataFrame({"conv_id": conv, "ts_us": np.array(ts, np.int64),
                         "turn_idx": np.arange(len(ts), dtype=np.int32),
                         "tool": ["t"] * len(ts)})


def test_state_delta_chain_roundtrip(tmp_path):
    """A store evolved over 6 epochs (appends + watermark evictions),
    checkpointed as full@0 then deltas, restores to EXACTLY the live state
    at every epoch — and delta files stay O(epoch appends), not O(state)."""
    store = SortedStateStore()
    wm = 0
    full_every = 100  # only epoch 0 is full -> longest possible chain

    def path(e: int) -> str:
        return str(tmp_path / f"epoch={e}" / "part-00000.parquet")

    live_snapshots = {}
    for e in range(6):
        # fold: append this epoch's join-buffer rows (a growing conversation)
        n = 50 * (e + 1)
        ts = np.arange(n) + e * 10_000
        du = _users([f"c{e % 2}"] * n, ts)
        dt = _tools([f"c{e % 2}"] * n, ts + 1)
        store.put("users", pd.concat([store.get("users"), du], ignore_index=True))
        store.put("tools", pd.concat([store.get("tools"), dt], ignore_index=True))
        store.put("wstats", pd.DataFrame(
            {"conv_id": [f"c{e}"], "window_start_us": np.array([e], np.int64),
             "n": np.array([e + 1], np.int64), "sum_c": np.array([e], np.int64),
             "min_c": np.array([e], np.int64), "max_c": np.array([e], np.int64)}))
        # emit: watermark-threshold evictions (the only eviction rule)
        wm = 5_000 * e
        u = store.get("users")
        store.put("users", u[u["ts_us"] >= wm - GAP])
        t = store.get("tools")
        store.put("tools", t[t["ts_us"] >= wm])
        mode = "full" if e % full_every == 0 else "delta"
        store.snapshot(path(e), mode=mode,
                       delta={"users": du, "tools": dt}, wm_after_us=wm)
        live_snapshots[e] = {k: store.get(k).copy()
                             for k in ("users", "tools", "wstats", "sessions",
                                       "sliding", "meta")}

    for e in range(6):
        wm_e = 5_000 * e
        got = SortedStateStore.restore_chain(path, e, GAP)
        for kind, want in live_snapshots[e].items():
            g = got.get(kind).reset_index(drop=True)
            w = want.reset_index(drop=True)
            pd.testing.assert_frame_equal(g, w, check_dtype=False), (e, kind)
        del wm_e

    # size claim: a late delta file carries only its epoch's appends, far
    # below the accumulated state a full snapshot would rewrite
    frames5, mode5, _ = SortedStateStore._parse_snapshot(path(5))
    assert mode5 == "delta"
    assert len(frames5["users"]) == 300  # epoch 5 appends only
    assert len(live_snapshots[5]["users"]) > 600  # accumulated live state
    full_path = str(tmp_path / "full5.parquet")
    store.snapshot(full_path, mode="full")
    assert os.path.getsize(path(5)) < os.path.getsize(full_path)


def test_restore_chain_missing_head_is_empty(tmp_path):
    got = SortedStateStore.restore_chain(
        lambda e: str(tmp_path / f"missing-{e}.parquet"), 3, GAP)
    assert got.total_rows() == 0


def test_cepbuf_delta_chain_roundtrip(tmp_path):
    """The CEP open-turn buffer delta-snapshots like the join buffers:
    full@0 + per-epoch deltas restore the exact live buffer at every epoch
    under the ts >= wm - within eviction threshold."""
    WITHIN = 200
    store = SortedStateStore()

    def path(e: int) -> str:
        return str(tmp_path / f"epoch={e}" / "part-00000.parquet")

    live = {}
    for e in range(5):
        n = 30 * (e + 1)
        ts = np.arange(n, dtype=np.int64) + e * 1_000
        new = pd.DataFrame({"conv_id": [f"c{e % 3}"] * n,
                            "turn_idx": np.arange(n, dtype=np.int32),
                            "n": np.array([e % 3] * n, np.int64),
                            "ts_us": ts})
        store.put("cepbuf", pd.concat([store.get("cepbuf"), new],
                                      ignore_index=True))
        wm = 800 * e
        buf = store.get("cepbuf")
        store.put("cepbuf", buf[buf["ts_us"] >= wm - WITHIN])
        store.snapshot(path(e), mode="full" if e == 0 else "delta",
                       delta={"cepbuf": new}, wm_after_us=wm)
        live[e] = store.get("cepbuf").copy()

    for e in range(5):
        got = SortedStateStore.restore_chain(path, e, GAP, cep_within_us=WITHIN)
        pd.testing.assert_frame_equal(
            got.get("cepbuf").reset_index(drop=True),
            live[e].reset_index(drop=True), check_dtype=False)
        # delta files stay O(epoch appends): the epoch-4 delta is smaller
        # than a full snapshot of the accumulated buffer would be
    import pyarrow.parquet as pq

    d4 = pq.read_table(path(4)).to_pandas()
    assert len(d4[d4["kind"] == "cepbuf"]) == 150  # epoch 4's appends only


def test_key_cap_per_epoch_equals_end_state_cap():
    """apply_key_cap's restore-equivalence claim: per-epoch
    (threshold-evict, then cap) composes to the same final state as
    (concat everything, final threshold, ONE cap) — including the nasty
    case of a LATE-but-accepted row whose turn_idx outranks rows the ts
    thresholds later evict (the reason the cap ranks by ts, not sort key)."""
    cap = 3
    # epoch appends for one hot conv: ts mostly increasing, one late row
    # (high turn_idx, low ts) in epoch 2
    epochs = [
        ([10, 20, 30, 40, 50], [0, 1, 2, 3, 4]),
        ([60, 70, 80], [5, 6, 7]),
        ([15, 90, 100], [8, 9, 10]),   # ts=15 is late-but-accepted
        ([110, 120], [11, 12]),
    ]
    wms = [0, 25, 60, 95]  # monotone per-epoch thresholds (keep ts >= wm)

    def frame(ts, idx):
        return pd.DataFrame({"conv_id": ["chot"] * len(ts),
                             "ts_us": np.array(ts, np.int64),
                             "turn_idx": np.array(idx, np.int32)})

    live = SortedStateStore()
    for (ts, idx), wm in zip(epochs, wms):
        u = pd.concat([live.get("users"), frame(ts, idx)], ignore_index=True)
        live.put("users", u[u["ts_us"] >= wm])
        live.apply_key_cap(cap)

    oneshot = SortedStateStore()
    allrows = pd.concat([frame(ts, idx) for ts, idx in epochs],
                        ignore_index=True)
    oneshot.put("users", allrows[allrows["ts_us"] >= wms[-1]])
    oneshot.apply_key_cap(cap)

    pd.testing.assert_frame_equal(
        live.get("users").reset_index(drop=True),
        oneshot.get("users").reset_index(drop=True))
    assert len(live.get("users")) == cap


def test_key_cap_deterministic_and_counts():
    """Cap keeps the ts-NEWEST rows per key (turn_idx tiebreak), returns
    exact dropped counts, and leaves under-cap keys and non-capped kinds
    untouched."""
    s = SortedStateStore()
    s.put("users", pd.DataFrame({
        "conv_id": ["a"] * 5 + ["b"] * 2,
        "ts_us": np.array([5, 4, 3, 2, 1, 9, 8], np.int64),
        "turn_idx": np.arange(7, dtype=np.int32)}))
    sess = pd.DataFrame({"conv_id": ["a"], "start_us": np.array([0], np.int64),
                         "end_us": np.array([99], np.int64),
                         "n": np.array([50], np.int64)})
    s.put("sessions", sess)
    dropped = s.apply_key_cap(2)
    assert dropped == {"users": 3}
    u = s.get("users")
    assert u[u["conv_id"] == "a"]["ts_us"].tolist() == [4, 5]  # newest two
    assert u[u["conv_id"] == "b"]["ts_us"].tolist() == [8, 9]
    pd.testing.assert_frame_equal(s.get("sessions"), sess)  # aggregates untouched


def test_merge_sorted_append_matches_stable_sort():
    """merge_sorted_append == concat + stable mergesort, for 2- and 3-key
    shapes, including a-before-b stability on full-key ties, empty sides,
    and keys absent from either side (the close-path fold-append contract)."""
    import random

    from pdf_watermark_remover_ray.state.store import merge_sorted_append

    rng = random.Random(7)
    for trial in range(60):
        nk = rng.choice([2, 3])
        keys = ["conv_id", "ts_us", "turn_idx"][:nk]

        def mk(sz):
            df = pd.DataFrame({
                "conv_id": [f"c{rng.randint(0, 9):02d}" for _ in range(sz)],
                "ts_us": np.array([rng.randint(0, 6) for _ in range(sz)],
                                  np.int64),
                "turn_idx": np.array([rng.randint(0, 4) for _ in range(sz)],
                                     np.int32),
                "payload": np.arange(sz)})
            return df.sort_values(keys, kind="mergesort").reset_index(drop=True)

        a, b = mk(rng.randint(0, 30)), mk(rng.randint(0, 12))
        b = b.assign(payload=b["payload"] + 1000)  # tags b rows for stability
        got = merge_sorted_append(a, b, keys)
        exp = pd.concat([a, b], ignore_index=True).sort_values(
            keys, kind="mergesort").reset_index(drop=True)
        pd.testing.assert_frame_equal(got, exp)
