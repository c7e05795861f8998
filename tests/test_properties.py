"""Property tests (SURVEY.md §5.3): invariants under re-slicing / re-partitioning,
hypothesis-driven scrub conformance, state snapshot roundtrip."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pdf_watermark_remover_ray.config import ScrubConfig, StreamConfig
from pdf_watermark_remover_ray.functions.scrub import scrub_text
from pdf_watermark_remover_ray.pipelines.streaming import StreamingEngine
from pdf_watermark_remover_ray.sources.transcripts import (
    generate_transcripts,
    write_transcripts,
)
from pdf_watermark_remover_ray.state.store import SortedStateStore, merge_session_intervals

from test_streaming import read_stream

# -- scrub: pure-function properties vs adversarial inputs ------------------

FRAGMENTS = [
    "CONFIDENTIEL J.DUPONT", "DOCUMENT NON APPLICABLE", "Document non tenu",
    "44 6f 63 75 6d", "6e 6f 6e 20 74 65 6e 75", "1 0 0 rg", "0.8 0 0 rg",
    "1 0 0 RG", "BT", "ET", "Tj", "TD", "(", ")", " ", "x", "à jour",
]


@settings(max_examples=300, deadline=None)
@given(st.lists(st.sampled_from(FRAGMENTS), max_size=12))
def test_scrub_idempotent_on_clean_output_prefixfree(parts):
    """Determinism + termination on adversarial pattern soup: the kernel never
    raises, always terminates, and running twice gives a fixed point for the
    T1/T2 substring deletes (span surgery can legitimately cascade)."""
    text = "".join(parts)
    out1, mod1 = scrub_text(text, "CONFIDENTIEL J.DUPONT", "DOCUMENT NON APPLICABLE")
    assert "CONFIDENTIEL J.DUPONT" not in out1
    assert "DOCUMENT NON APPLICABLE" not in out1
    out2, _ = scrub_text(out1, "CONFIDENTIEL J.DUPONT", "DOCUMENT NON APPLICABLE")
    # T1/T2 deletes are gone for good
    assert "CONFIDENTIEL J.DUPONT" not in out2
    if not mod1:
        assert out1 == text


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=200))
def test_scrub_passthrough_without_anchors(text):
    """Any text containing none of the anchors passes through byte-identical."""
    anchors = ["CONFIDENTIEL J.DUPONT", "DOCUMENT NON APPLICABLE",
               "Document non tenu", "44 6f 63 75 6d 65 6e 74 20 6e 6f 6e 20 74 65 6e 75",
               "6f 63 75 6d 65 6e 74 20 6e 6f 6e 20 74 65 6e 75", "44 6f 63 75 6d",
               "6e 6f 6e 20 74 65 6e 75", "1 0 0 rg", "0.8 0 0 rg", "1 0 0 RG"]
    if any(a in text for a in anchors):
        return
    out, mod = scrub_text(text, "CONFIDENTIEL J.DUPONT", "DOCUMENT NON APPLICABLE")
    assert out == text and not mod


# -- session interval merge: algebraic properties ----------------------------

@settings(max_examples=100, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 3), st.integers(0, 1000)), min_size=1,
                max_size=40))
def test_session_merge_matches_naive(items):
    gap = 50
    df = pd.DataFrame({
        "conv_id": [f"c{c}" for c, _ in items],
        "start_us": [t for _, t in items],
        "end_us": [t for _, t in items],
        "n": np.ones(len(items), dtype=np.int64),
    })
    got = merge_session_intervals(df, gap)
    # naive per-conv sweep
    want_rows = []
    for conv, g in df.groupby("conv_id"):
        ts = sorted(g["start_us"])
        cur = [ts[0], ts[0], 1]
        for t in ts[1:]:
            if t - cur[1] > gap:
                want_rows.append((conv, cur[0], cur[1], cur[2]))
                cur = [t, t, 1]
            else:
                cur[1] = max(cur[1], t)
                cur[2] += 1
        want_rows.append((conv, cur[0], cur[1], cur[2]))
    want = pd.DataFrame(want_rows, columns=["conv_id", "start_us", "end_us", "n"])
    g = got.sort_values(["conv_id", "start_us"]).reset_index(drop=True)
    w = want.sort_values(["conv_id", "start_us"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(g, w.astype(g.dtypes.to_dict()))


# -- snapshot roundtrip ------------------------------------------------------

def test_state_snapshot_roundtrip(tmp_path):
    store = SortedStateStore()
    store.put("sessions", pd.DataFrame(
        {"conv_id": ["a", "b"], "start_us": [1, 2], "end_us": [3, 4],
         "n": [2, 5]}))
    store.put("users", pd.DataFrame(
        {"conv_id": ["a"], "ts_us": [7], "turn_idx": np.array([3], np.int32)}))
    store.put("meta", pd.DataFrame({"conv_id": ["sliding_emit_bound"], "n": [123]}))
    path = str(tmp_path / "snap" / "part-0.parquet")
    store.snapshot(path)
    back = SortedStateStore.restore(path)
    for kind in store.frames:
        pd.testing.assert_frame_equal(store.get(kind), back.get(kind))


# -- streaming: conservation + slicing invariance ----------------------------

def _union_rows(out_dir):
    turns = read_stream(out_dir, "turns")[["conv_id", "turn_idx"]]
    late = read_stream(out_dir, "late")[["conv_id", "turn_idx"]]
    return pd.concat([turns, late], ignore_index=True) \
        .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)


def test_epoch_slicing_conservation_and_invariance(tmp_path):
    """(a) Conservation: every input row lands in exactly one of turns/late,
    under ANY epoch slicing.  (b) With unbounded lateness the full output is
    invariant under the slicing (watermark granularity only moves the
    late/live boundary)."""
    table = generate_transcripts(n_convs=40, mean_turns=10, seed=33, late_frac=0.1)
    paths = write_transcripts(table, str(tmp_path / "in"), num_files=8)
    all_keys = table.to_pandas()[["conv_id", "turn_idx"]] \
        .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)

    for ef in (1, 4):
        out = str(tmp_path / f"out_ef{ef}")
        StreamingEngine(paths, out, StreamConfig(num_partitions=4),
                        epoch_files=ef).run()
        got = _union_rows(out)
        pd.testing.assert_frame_equal(got.astype(str), all_keys.astype(str))

    big = 1 << 60
    outs = []
    for ef in (1, 4):
        out = str(tmp_path / f"out_inf_ef{ef}")
        cfg = StreamConfig(num_partitions=4, lateness_us=big)
        StreamingEngine(paths, out, cfg, epoch_files=ef).run()
        t = read_stream(out, "turns").sort_values(["conv_id", "turn_idx"]) \
            .reset_index(drop=True)
        outs.append(t[["conv_id", "turn_idx", "text", "modified"]])
        assert len(read_stream(out, "late")) == 0
        s = read_stream(out, "sessions").sort_values(
            ["conv_id", "session_start_us"]).reset_index(drop=True)
        outs.append(s)
    pd.testing.assert_frame_equal(outs[0], outs[2])
    pd.testing.assert_frame_equal(outs[1], outs[3])


@given(
    size_mult=st.integers(min_value=1, max_value=12),
    slide_mult=st.integers(min_value=1, max_value=12),
    unit=st.sampled_from([1, 3, 7, 10]),
    ts=st.lists(st.integers(min_value=0, max_value=10_000), min_size=1,
                max_size=40),
)
@settings(max_examples=200, deadline=None)
def test_sliding_gcd_bucket_windows_match_per_event(size_mult, slide_mult,
                                                    unit, ts):
    """For ANY size/slide (divisible or not): the windows assigned to an
    event's gcd-bucket are exactly the per-event window memberships — the
    invariant the streaming rollup relies on."""
    from pdf_watermark_remover_ray.config import Sliding

    spec = Sliding(size_us=size_mult * unit, slide_us=slide_mult * unit)
    size, slide, g = spec.size_us, spec.slide_us, spec.bucket_us
    n_off = spec.n_windows_per_bucket()
    for t in ts:
        # per-event membership: ws = k*slide with t-size < ws <= t
        per_event = {k * slide for k in range((t - size) // slide + 1,
                                              t // slide + 1) if k * slide <= t}
        b = spec.assign_bucket(t)
        top = (b // slide) * slide
        via_bucket = {top - j * slide for j in range(n_off)
                      if top - j * slide >= b + g - size}
        assert via_bucket == per_event, (size, slide, t, b)


def test_quantile_rollup_matches_numpy_random_multisets():
    """quantile_rollup's ceil(q·n)−1 element selection over value-counts
    equals direct selection on the raw sorted values — duplicates, singleton
    groups and n=1 included."""
    import math

    import ray.data

    from pdf_watermark_remover_ray.pipelines.relational import quantile_rollup

    rng = np.random.default_rng(17)
    vals = np.concatenate([
        rng.integers(0, 30, 400),          # heavy duplicates
        rng.integers(0, 10_000, 200),      # sparse
    ]).astype(np.float64)
    keys = np.concatenate([rng.choice(["a", "b", "c"], 599), ["solo"]])
    df = pd.DataFrame({"k": keys, "v": vals})
    out = quantile_rollup(ray.data.from_pandas(df).repartition(7),
                          "k", "v", qs=(0.5, 0.9), suffix="v").to_pandas()
    for _, row in out.iterrows():
        sub = np.sort(df.loc[df["k"] == row["k"], "v"].to_numpy())
        assert row["n"] == len(sub)
        for q, c in ((0.5, "p50_v"), (0.9, "p90_v")):
            idx = min(max(math.ceil(q * len(sub)) - 1, 0), len(sub) - 1)
            assert row[c] == sub[idx], (row["k"], q)


def test_quantile_cont_rollup_collapses_cross_batch_duplicates():
    """The fused one-exchange fold must merge duplicate values arriving in
    partials from DIFFERENT batches before interpolating — equality with
    numpy's linear interpolation on the raw values proves the collapse
    (a count miscount would shift the cumulative index)."""
    import ray.data

    from pdf_watermark_remover_ray.pipelines.relational import \
        quantile_cont_rollup

    rng = np.random.default_rng(23)
    vals = rng.integers(0, 25, 900).astype(np.float64)  # heavy duplicates
    keys = rng.choice(["a", "b"], 900)
    df = pd.DataFrame({"k": keys, "v": vals})
    out = quantile_cont_rollup(ray.data.from_pandas(df).repartition(11),
                               "k", "v", qs=(0.5, 0.9), suffix="v") \
        .to_pandas()
    assert len(out) == 2
    import math

    for _, row in out.iterrows():
        sub = np.sort(df.loc[df["k"] == row["k"], "v"].to_numpy())
        assert row["n"] == len(sub)
        for q, c in ((0.5, "c50_v"), (0.9, "c90_v")):
            rn = q * (len(sub) - 1)
            frn, crn = math.floor(rn), math.ceil(rn)
            want = sub[frn] if crn == frn else \
                (crn - rn) * sub[frn] + (rn - frn) * sub[crn]
            assert row[c] == want, (row["k"], q)


def test_heavy_hitters_invariant_under_batch_split():
    """The candidate pass sees different batch boundaries under different
    partitionings, but the verified output must be identical (and equal to
    brute force) — the pigeonhole completeness is split-independent."""
    import ray.data

    from pdf_watermark_remover_ray.functions.sketches import heavy_hitters

    rng = np.random.default_rng(29)
    col = np.concatenate([rng.integers(0, 3000, 8000),
                          np.repeat([7, 8], 1500)]).astype(str)
    rng.shuffle(col)
    df = pd.DataFrame({"u": col})
    width = 12
    outs = []
    for parts in (1, 4, 23):
        out = heavy_hitters(ray.data.from_pandas(df).repartition(parts),
                            "u", width=width)
        outs.append(dict(zip(out["item"], out["n"])))
    vc = pd.Series(col).value_counts()
    want = {str(k): int(v) for k, v in vc[vc * width > len(col)].items()}
    assert outs[0] == outs[1] == outs[2] == want


def test_quantile_cont_rollup_matches_numpy_linear():
    """quantile_cont_rollup's interpolation over value-counts equals
    numpy's 'linear' percentile on the raw values (same RN = q(n−1) rule),
    including singleton groups and duplicate-heavy multisets."""
    import ray.data

    from pdf_watermark_remover_ray.pipelines.relational import quantile_cont_rollup

    rng = np.random.default_rng(23)
    vals = np.concatenate([
        rng.integers(0, 25, 500),
        rng.normal(100, 5, 300).round(2),
    ]).astype(np.float64)
    keys = np.concatenate([rng.choice(["x", "y", "z"], 799), ["solo"]])
    df = pd.DataFrame({"k": keys, "v": vals})
    out = quantile_cont_rollup(ray.data.from_pandas(df).repartition(5),
                               "k", "v", qs=(0.5, 0.9), suffix="v").to_pandas()
    assert set(out["k"]) == {"x", "y", "z", "solo"}
    for _, row in out.iterrows():
        sub = df.loc[df["k"] == row["k"], "v"].to_numpy()
        assert row["n"] == len(sub)
        for q, c in ((0.5, "c50_v"), (0.9, "c90_v")):
            want = np.percentile(sub, q * 100, method="linear")
            assert np.isclose(row[c], want, rtol=0, atol=1e-9), (row["k"], q)


def test_rollup_and_pivot_consistency(sf_dir):
    """ROLLUP levels are mutually consistent (children sum to parents) and
    the pivot's wide counts sum to the total event count."""
    from pdf_watermark_remover_ray.pipelines.relational import (
        order_priority_rollup,
        user_event_pivot,
    )

    roll = order_priority_rollup(sf_dir)
    fine = roll[(roll["o_orderstatus"] != "ALL")
                & (roll["o_orderpriority"] != "ALL")]
    mid = roll[(roll["o_orderstatus"] != "ALL")
               & (roll["o_orderpriority"] == "ALL")]
    top = roll[(roll["o_orderstatus"] == "ALL")
               & (roll["o_orderpriority"] == "ALL")]
    assert len(top) == 1 and top["n"].iloc[0] == fine["n"].sum()
    per_status = fine.groupby("o_orderstatus")["n"].sum()
    for _, r in mid.iterrows():
        assert r["n"] == per_status[r["o_orderstatus"]]

    piv = user_event_pivot(sf_dir).to_pandas()
    import pyarrow.parquet as pq

    n_events = pq.read_metadata(f"{sf_dir}/events.parquet").num_rows
    wide_cols = [c for c in piv.columns if c.startswith("n_")]
    assert piv[wide_cols].to_numpy().sum() == n_events


def test_approx_quantiles_error_bound():
    """Histogram-sketch quantiles land within one bucket width of the exact
    interpolated quantile, on a skewed multimodal distribution."""
    import ray.data

    from pdf_watermark_remover_ray.functions.sketches import approx_quantiles

    rng = np.random.default_rng(31)
    vals = np.concatenate([rng.normal(10, 1, 4000),
                           rng.normal(1000, 50, 1000),
                           rng.exponential(5, 2000)])
    keys = rng.choice(["a", "b"], size=len(vals))
    df = pd.DataFrame({"k": keys, "v": vals})
    bins = 512
    out = approx_quantiles(ray.data.from_pandas(df).repartition(6),
                           "k", "v", qs=(0.5, 0.9, 0.99), bins=bins,
                           suffix="v")
    for _, row in out.iterrows():
        sub = df.loc[df["k"] == row["k"], "v"].to_numpy()
        width = (sub.max() - sub.min()) / bins
        assert row["n"] == len(sub)
        for q, c in ((0.5, "q50_v"), (0.9, "q90_v"), (0.99, "q99_v")):
            exact = np.quantile(sub, q)
            assert abs(row[c] - exact) <= width + 1e-9, (row["k"], q)


def test_cohort_and_decontaminate_partition_invariance(sf_dir):
    """Results of the keyed-co-location ops are pure functions of the data,
    not of the partition count (the property that makes them safe to re-tune
    for cluster size)."""
    import pandas as pd

    from pdf_watermark_remover_ray.functions.sampling import decontaminate_split
    from pdf_watermark_remover_ray.pipelines.relational import cohort_retention

    def norm(ds):
        df = ds.to_pandas()
        cols = sorted(df.columns)
        return df[cols].sort_values(cols).reset_index(drop=True)

    a = norm(cohort_retention(sf_dir, num_partitions=2))
    b = norm(cohort_retention(sf_dir, num_partitions=17))
    pd.testing.assert_frame_equal(a, b)

    a = norm(decontaminate_split(sf_dir, num_partitions=2))
    b = norm(decontaminate_split(sf_dir, num_partitions=17))
    pd.testing.assert_frame_equal(a, b)


@settings(max_examples=200, deadline=None)
@given(st.lists(
    st.tuples(st.integers(0, 2),          # conv
              st.sampled_from(["user", "assistant", "tool"]),
              st.integers(0, 40)),        # ts (small domain forces ties)
    max_size=24),
    st.integers(1, 10))                    # window
def test_absence_scan_matches_bruteforce(rows, within):
    """CEP negation kernel vs the NOT-EXISTS brute force on random small
    streams with heavy timestamp ties and cross-conversation traffic."""
    from pdf_watermark_remover_ray.stages.cep import absence_scan

    df = pd.DataFrame({
        "conv_id": [f"c{c}" for c, _, _ in rows],
        "turn_idx": np.arange(len(rows), dtype=np.int32),
        "role": [r for _, r, _ in rows],
        "ts": pd.to_datetime([t for _, _, t in rows], unit="us"),
    })
    got = absence_scan(df, within)
    got_set = set(zip(got["conv_id"], got["turn_idx"]))
    want = set()
    for i, (c, r, t) in enumerate(rows):
        if r != "user":
            continue
        cleared = any(c2 == c and r2 == "assistant" and t <= t2 <= t + within
                      for (c2, r2, t2) in rows)
        if not cleared:
            want.add((f"c{c}", i))
    assert got_set == want
    for _, row in got.iterrows():
        assert row["deadline_us"] == rows[int(row["turn_idx"])][2] + within


# -- CEP kernels: masked sequence scan + followed-by vs brute force ----------

_roles = st.sampled_from(["user", "tool", "assistant"])
_tools = st.sampled_from(["", "search", "exec"])


@st.composite
def _cep_frames(draw):
    n = draw(st.integers(1, 40))
    convs = draw(st.lists(st.sampled_from(["a", "b", "c"]),
                          min_size=n, max_size=n))
    df = pd.DataFrame({
        "conv_id": convs,
        "role": draw(st.lists(_roles, min_size=n, max_size=n)),
        "tool": draw(st.lists(_tools, min_size=n, max_size=n)),
        "text": draw(st.lists(st.sampled_from(["k 1", "k 22", "x", ""]),
                              min_size=n, max_size=n)),
        "ts": pd.to_datetime(
            draw(st.lists(st.integers(0, 10_000), min_size=n, max_size=n)),
            unit="s"),
    })
    # unique, possibly SPARSE turn_idx per conv (in arbitrary ts order)
    df["turn_idx"] = np.int32(0)
    for c, g in df.groupby("conv_id", sort=False):
        tix = np.cumsum(draw(st.lists(st.integers(1, 3), min_size=len(g),
                                      max_size=len(g))))
        df.loc[g.index, "turn_idx"] = tix.astype(np.int32)
    return df


@settings(max_examples=120, deadline=None)
@given(_cep_frames(), st.integers(0, 2))
def test_masked_sequence_scan_matches_bruteforce(df, within_s):
    from pdf_watermark_remover_ray.stages.cep import (
        Term, masked_sequence_scan, term_mask)
    from pdf_watermark_remover_ray.stages.windows import ts_us_series

    terms = (Term(role="user", text_regex=r"k \d\d"),
             Term(role="tool", tool="search"))
    within = within_s * 1_000_000_000
    d = df.sort_values(["conv_id", "turn_idx"], kind="mergesort") \
        .reset_index(drop=True)
    masks = [term_mask(d, t) for t in terms]
    conv = d["conv_id"].to_numpy()
    tix = d["turn_idx"].to_numpy(np.int64)
    ts = ts_us_series(d["ts"])
    idx, dt = masked_sequence_scan(conv, tix, ts, masks, within)
    got = sorted(zip(conv[idx], tix[idx], dt))
    want = []
    for i in range(len(d) - 1):
        r0, r1 = d.iloc[i], d.iloc[i + 1]
        if (r0["conv_id"] == r1["conv_id"]
                and r1["turn_idx"] == r0["turn_idx"] + 1
                and masks[0][i] and masks[1][i + 1]):
            span = abs(int(ts[i + 1]) - int(ts[i]))
            if span <= within:
                want.append((r0["conv_id"], int(r0["turn_idx"]), span))
    assert got == sorted(want)


@settings(max_examples=120, deadline=None)
@given(_cep_frames(), st.integers(0, 2))
def test_followed_by_scan_matches_bruteforce(df, within_s):
    from pdf_watermark_remover_ray.stages.cep import Term, followed_by_scan
    from pdf_watermark_remover_ray.stages.windows import ts_us_series

    first = Term(role="user")
    then = Term(role="tool", tool="exec")
    within = within_s * 1_000_000_000
    out = followed_by_scan(df, first, then, within)
    got = sorted(zip(out["conv_id"], out["turn_idx"].astype(int),
                     out["dt_us"].astype(int)))
    ts = ts_us_series(df["ts"])
    want = []
    for i in range(len(df)):
        if df["role"].iloc[i] != "user":
            continue
        cands = [int(ts[j]) - int(ts[i]) for j in range(len(df))
                 if df["conv_id"].iloc[j] == df["conv_id"].iloc[i]
                 and df["role"].iloc[j] == "tool"
                 and df["tool"].iloc[j] == "exec"
                 and int(ts[j]) >= int(ts[i])
                 and int(ts[j]) - int(ts[i]) <= within]
        if cands:
            want.append((df["conv_id"].iloc[i],
                         int(df["turn_idx"].iloc[i]), min(cands)))
    assert got == sorted(want)


# -- round-4 session-4 kernels ----------------------------------------------

@given(st.lists(st.tuples(st.integers(0, 0xFFFF), st.integers(0, 0xFFFF)),
                min_size=1, max_size=200))
@settings(max_examples=50, deadline=None)
def test_interleave16_is_injective_and_monotone_per_dim(pairs):
    from pdf_watermark_remover_ray.pipelines.relational import _interleave16

    a = np.array([p[0] for p in pairs], dtype=np.int64)
    b = np.array([p[1] for p in pairs], dtype=np.int64)
    z = _interleave16(a, b)
    # injective: distinct (a, b) -> distinct z
    assert len(set(zip(a.tolist(), b.tolist()))) == len(set(z.tolist()))
    # monotone along each axis with the other held fixed
    z2 = _interleave16(a + 1, b)
    assert ((a + 1 > 0xFFFF) | (z2 > z)).all()
    z3 = _interleave16(a, b + 1)
    assert ((b + 1 > 0xFFFF) | (z3 > z)).all()


@given(st.integers(1, 2000), st.integers(1, 100))
@settings(max_examples=100, deadline=None)
def test_wquant_rank_target_is_nearest_rank(n, p):
    """ceil(n*p/100) in integer arithmetic, in [1, n], and equal to the
    textbook float formula wherever the float is representable exactly."""
    target = (n * p + 99) // 100
    assert 1 <= target <= n
    import math

    assert target == math.ceil(n * p / 100) or (n * p) % 100 != 0


def test_weighted_sample_monotone_in_weight():
    """For a FIXED uniform u, raising a document's weight can only raise
    its A-ES key u^(1/w) — heavier docs never become less likely."""
    u = np.linspace(0.05, 0.95, 19)
    w1 = u ** (1.0 / 10.0)
    w2 = u ** (1.0 / 100.0)
    assert (w2 >= w1).all()
