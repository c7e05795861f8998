"""Pure-Python single-process oracle for the streaming engine (SURVEY.md §5).

Replays the exact semantics of :mod:`.pipelines.streaming` — epoch slicing,
watermark, late drops, session close, window emission, join firing — in plain
pandas on the driver, sharing the already-DuckDB-verified per-partition
kernels (scrub_text, sessionize_pdf, join_pdf) so the comparison checks the
*distributed execution*, not two divergent interpretations.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .config import StreamConfig
from .functions.scrub import oracle_scrub_rows
from .stages.join import join_pdf
from .stages.windows import sessionize_pdf, wtopk_project


def arrival_epochs(table: pa.Table, num_files: int, epoch_files: int) -> np.ndarray:
    """Epoch id per row of the fixture table — replicates
    ``write_transcripts(split_by='ts')`` + ``StreamingEngine`` file slicing."""
    order_col = "arrival_us" if "arrival_us" in table.column_names else "ts"
    key = table[order_col].cast(pa.int64()).to_numpy()
    order = np.argsort(key, kind="stable")
    rank = np.empty(len(key), dtype=np.int64)
    rank[order] = np.arange(len(key))
    bounds = np.linspace(0, len(key), num_files + 1).astype(np.int64)
    file_of_rank = np.searchsorted(bounds[1:], np.arange(len(key)), side="right")
    file_idx = file_of_rank[rank]
    return (file_idx // epoch_files).astype(np.int64)


def streaming_oracle(table: pa.Table, num_files: int, epoch_files: int,
                     cfg: StreamConfig) -> dict[str, pd.DataFrame]:
    """Expected final outputs of a full streaming run over the fixture."""
    epoch = arrival_epochs(table, num_files, epoch_files)
    ts_us = table["ts"].cast(pa.int64()).to_numpy()
    n_epochs = int(epoch.max()) + 1 if len(epoch) else 0

    # watermark_after(e) = cummax over per-epoch max ts − lateness.
    wm_after = np.full(n_epochs, -(1 << 62), dtype=np.int64)
    for e in range(n_epochs):
        m = ts_us[epoch == e]
        prev = wm_after[e - 1] if e > 0 else -(1 << 62)
        cur = int(m.max()) if len(m) else -(1 << 62)
        wm_after[e] = max(prev, cur)
    wm_after = wm_after - cfg.lateness_us

    late_mask = np.zeros(len(table), dtype=bool)
    for e in range(1, n_epochs):
        in_e = epoch == e
        late_mask |= in_e & (ts_us < wm_after[e - 1])

    df = pd.DataFrame(
        {
            "conv_id": table["conv_id"].to_pandas().to_numpy(),
            "turn_idx": table["turn_idx"].to_pandas().to_numpy().astype(np.int32),
            "role": table["role"].to_pandas().to_numpy(),
            "text": table["text"].to_pandas().to_numpy(),
            "tool": table["tool"].to_pandas().to_numpy(),
            "ts": ts_us.astype("datetime64[us]"),
            "ts_us": ts_us,
            "epoch": epoch,
        }
    )
    late = df[late_mask]
    live = df[~late_mask].copy()

    scrubbed = oracle_scrub_rows(live["text"].tolist(), cfg.scrub)
    live["text"] = [t for t, _ in scrubbed]
    live["modified"] = [m for _, m in scrubbed]

    sessions = sessionize_pdf(live, cfg.session_gap_us)
    matches = join_pdf(live, cfg.join_gap_us)
    ws = (live["ts_us"].to_numpy() // cfg.tumbling_us) * cfg.tumbling_us
    windows = (
        pd.DataFrame({"conv_id": live["conv_id"].to_numpy(), "window_start_us": ws})
        .groupby(["conv_id", "window_start_us"], as_index=False)
        .size()
        .rename(columns={"size": "n_turns"})
    )
    # sliding windows: each turn in every window k*slide with t-size < k*slide <= t
    size, slide = cfg.sliding_size_us, cfg.sliding_slide_us
    lts = live["ts_us"].to_numpy()
    k_max = lts // slide
    k_min = (lts - size) // slide + 1
    counts = (k_max - k_min + 1).astype(np.int64)
    s_keys = np.repeat(live["conv_id"].to_numpy(), counts)
    offs = np.concatenate([np.arange(c) for c in counts]) if len(counts) else \
        np.array([], np.int64)
    s_ws = (np.repeat(k_min, counts) + offs) * slide
    sliding = (
        pd.DataFrame({"conv_id": s_keys, "window_start_us": s_ws})
        .groupby(["conv_id", "window_start_us"], as_index=False)
        .size()
        .rename(columns={"size": "n_turns"})
    )
    # per-window value stats over the SCRUBBED text length
    n_chars = np.array([len(t) if isinstance(t, str) else 0
                        for t in live["text"]], dtype=np.int64)
    wstats = (
        pd.DataFrame({"conv_id": live["conv_id"].to_numpy(),
                      "window_start_us": ws, "c": n_chars})
        .groupby(["conv_id", "window_start_us"], as_index=False)
        .agg(n_turns=("c", "size"), sum_chars=("c", "sum"),
             min_chars=("c", "min"), max_chars=("c", "max"))
    )
    # windowed nearest-rank percentiles of the text length (wquant): same
    # integer rank target as the engine — ceil(n*p/100) over value-sorted
    # per-window counts
    if cfg.wquant_ps:
        wq = (pd.DataFrame({"conv_id": live["conv_id"].to_numpy(),
                            "window_start_us": ws, "val": n_chars})
              .groupby(["conv_id", "window_start_us", "val"], as_index=False)
              .size().rename(columns={"size": "n"})
              .sort_values(["conv_id", "window_start_us", "val"],
                           kind="mergesort"))
        g = wq.groupby(["conv_id", "window_start_us"], sort=False)
        tot = g["n"].transform("sum").to_numpy(np.int64)
        cum = g["n"].cumsum().to_numpy(np.int64)
        first = ~wq.duplicated(["conv_id", "window_start_us"]).to_numpy()
        base = wq[first]
        wquant = pd.DataFrame({
            "conv_id": base["conv_id"].to_numpy(),
            "window_start_us": base["window_start_us"].to_numpy(np.int64),
            "n_turns": tot[first]})
        for p in cfg.wquant_ps:
            sel = wq[cum >= (tot * p + 99) // 100]                 .drop_duplicates(["conv_id", "window_start_us"])
            wquant[f"p{p}_chars"] = sel["val"].to_numpy(np.int64)
    else:
        wquant = pd.DataFrame({"conv_id": pd.Series([], dtype=str),
                               "window_start_us": pd.Series([], dtype=np.int64),
                               "n_turns": pd.Series([], dtype=np.int64)})
    # windowed COUNT DISTINCT + top-k of tools (tool-role turns only) —
    # both project from the per-(conv, window, tool) count table, exactly
    # like the engine's shared wtools state
    tl = live[live["role"] == "tool"]
    wtool_counts = (
        pd.DataFrame({"conv_id": tl["conv_id"].to_numpy(),
                      "window_start_us": (tl["ts_us"].to_numpy()
                                          // cfg.tumbling_us) * cfg.tumbling_us,
                      "tool": tl["tool"].to_numpy()})
        .groupby(["conv_id", "window_start_us", "tool"], as_index=False)
        .size().rename(columns={"size": "n"})
    )
    wdistinct = (
        wtool_counts.groupby(["conv_id", "window_start_us"], as_index=False)
        .size().rename(columns={"size": "n_tools"})
    )
    wtopk = wtopk_project(wtool_counts, cfg.wtopk_k)
    # streaming dedup: one winner per distinct scrubbed text — the min
    # (conv_id, turn_idx) within the FIRST epoch containing that text (the
    # engine's arrival-order-free winner rule; null text keys as "" exactly
    # like the engine's fillna-then-hash).  With a TTL, a text unseen for
    # dedup_ttl_us of event time is forgotten at each epoch close (threshold
    # wm_after(e) − ttl against the text's event-time high mark) and its
    # next occurrence wins again.
    dd = live.assign(_k=live["text"].fillna("")).sort_values(
        ["epoch", "conv_id", "turn_idx"], kind="mergesort")
    if cfg.dedup_ttl_us is None:
        dedup = dd.drop_duplicates(subset=["_k"])[["conv_id", "turn_idx"]]
    else:
        marks: dict[str, int] = {}
        rows = []
        for e in range(n_epochs):
            sub = dd[dd["epoch"] == e]
            for key, g in sub.groupby("_k", sort=False):
                if key not in marks:
                    rows.append(g.iloc[0][["conv_id", "turn_idx"]])
                marks[key] = max(marks.get(key, -(1 << 62)),
                                 int(g["ts_us"].max()))
            thr = wm_after[e] - cfg.dedup_ttl_us
            marks = {k: v for k, v in marks.items() if v >= thr}
        dedup = pd.DataFrame(rows, columns=["conv_id", "turn_idx"]) \
            if rows else pd.DataFrame({"conv_id": pd.Series([], dtype=str),
                                       "turn_idx": pd.Series([], dtype=np.int32)})
    # CEP: contiguous role-sequence matches over the ACCEPTED (non-late)
    # rows — final union over epochs equals the batch matcher on live rows
    # (a match completes exactly once; eviction provably loses none).
    from .stages.cep import kleene_scan, sequence_scan

    cl = live.sort_values(["conv_id", "turn_idx"], kind="mergesort")
    cconv = cl["conv_id"].to_numpy()
    crole = cl["role"].to_numpy()
    ctix = cl["turn_idx"].to_numpy().astype(np.int64)
    cts = cl["ts_us"].to_numpy(np.int64)
    idx, dt = sequence_scan(cconv, crole, ctix, cts, cfg.cep_pattern,
                            cfg.cep_within_us)
    cep = pd.DataFrame({"conv_id": cconv[idx] if len(idx) else
                        pd.Series([], dtype=str),
                        "turn_idx": ctix[idx].astype(np.int32),
                        "dt_us": dt})
    # Kleene-plus ("cepk"): the same shared scan module

    sp, s, e, en, dtk = kleene_scan(cconv, crole, ctix, cts,
                                    cfg.cep_within_us,
                                    user="user", tool="tool",
                                    assistant="assistant")
    cepk = pd.DataFrame({"conv_id": cconv[s] if len(s) else
                         pd.Series([], dtype=str),
                         "turn_idx": ctix[sp].astype(np.int32) if len(sp) else
                         pd.Series([], dtype=np.int32),
                         "n_tools": (e - s + 1).astype(np.int64),
                         "dt_us": dtk})
    # predicated stream ("cepp"): masks over the SCRUBBED live rows — the
    # engine evaluates the terms at route time, after the scrub
    cepp = None
    if cfg.cep_terms is not None:
        from .stages.cep import masked_sequence_scan, term_mask

        masks = [term_mask(cl, t) for t in cfg.cep_terms]
        idxp, dtp = masked_sequence_scan(cconv, ctix, cts, masks,
                                         cfg.cep_within_us)
        cepp = pd.DataFrame({"conv_id": cconv[idxp] if len(idxp) else
                             pd.Series([], dtype=str),
                             "turn_idx": ctix[idxp].astype(np.int32),
                             "dt_us": dtp})
    # CEP negation ("timeouts"): live user turns with no live assistant ts
    # in [trigger, trigger + within].  On bounded input every uncleared
    # trigger fires by the end — the engine's final flush closes with
    # wm = ∞ because no clearing turn can ever arrive after the last file.
    w = cfg.timeout_within_us
    tu = live[live["role"] == "user"]
    ta = live[live["role"] == "assistant"]
    lt = pd.DataFrame({"conv_id": tu["conv_id"].to_numpy(),
                       "turn_idx": tu["turn_idx"].to_numpy(np.int32),
                       "ts_us": tu["ts_us"].to_numpy(np.int64)}) \
        .sort_values("ts_us", kind="mergesort")
    if len(lt) and len(ta):
        rt = pd.DataFrame({"conv_id": ta["conv_id"].to_numpy(),
                           "a_ts_us": ta["ts_us"].to_numpy(np.int64)}) \
            .sort_values("a_ts_us", kind="mergesort")
        mm = pd.merge_asof(lt, rt, left_on="ts_us", right_on="a_ts_us",
                           by="conv_id", direction="forward")
        cleared = mm["a_ts_us"].notna().to_numpy() \
            & (mm["a_ts_us"].to_numpy() - mm["ts_us"].to_numpy() <= w)
        lt = mm[~cleared]
    timeouts = pd.DataFrame({
        "conv_id": lt["conv_id"].to_numpy(),
        "turn_idx": lt["turn_idx"].to_numpy(np.int32) if len(lt)
        else pd.Series([], dtype=np.int32),
        "deadline_us": (lt["ts_us"].to_numpy(np.int64) + w) if len(lt)
        else pd.Series([], dtype=np.int64)})
    tl = live[live["role"] == "tool"]
    dim = {d[0]: (d[1], d[2]) for d in cfg.enrich_dim}
    enrich = pd.DataFrame({
        "conv_id": tl["conv_id"].to_numpy(),
        "turn_idx": tl["turn_idx"].to_numpy(np.int32) if len(tl)
        else pd.Series([], dtype=np.int32),
        "tool": tl["tool"].to_numpy(),
        "tool_group": [dim.get(t, ("unknown", 0.0))[0]
                       for t in tl["tool"]],
        "tool_weight": [dim.get(t, ("unknown", 0.0))[1]
                        for t in tl["tool"]]})
    return {
        "turns": live[["conv_id", "turn_idx", "role", "text", "tool", "ts", "modified"]],
        "enrich": enrich,
        "cep": cep,
        "cepk": cepk,
        "cepp": cepp,
        "timeouts": timeouts,
        "dedup": dedup,
        "late": late[["conv_id", "turn_idx", "ts_us", "epoch"]],
        "sessions": sessions,
        "windows": windows,
        "wstats": wstats,
        "wquant": wquant,
        "wdistinct": wdistinct,
        "wtopk": wtopk,
        "sliding": sliding,
        "matches": matches,
    }
