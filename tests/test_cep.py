"""CEP sequence/Kleene pattern matching vs DuckDB oracle + brute force."""

from __future__ import annotations

import numpy as np
import pandas as pd

from pdf_watermark_remover_ray.pipelines import queries as Q
from pdf_watermark_remover_ray.sources.transcripts import derive_transcripts
from pdf_watermark_remover_ray.stages.cep import kleene_matches, sequence_matches
from pdf_watermark_remover_ray.stages.windows import ts_us_series


from conftest import assert_frames_match as _cmp
from conftest import duck_sql


def _duck(sf_dir: str, sql: str) -> pd.DataFrame:
    return duck_sql(sf_dir, sql, tables=("events",))


def test_cep_funnel_matches_sql(sf_dir):
    ray_df = Q.q_cep_funnel(sf_dir).to_pandas()
    duck_df = _duck(sf_dir, Q.oracle_sql()["cep_funnel"])
    assert len(ray_df) > 0  # the fixture actually contains funnels
    _cmp(ray_df, duck_df)


def test_cep_tool_bursts_matches_sql(sf_dir):
    ray_df = Q.q_cep_tool_bursts(sf_dir).to_pandas()
    duck_df = _duck(sf_dir, Q.oracle_sql()["cep_tool_bursts"])
    assert len(ray_df) > 0
    # multi-tool bursts must exist, or the Kleene-plus is just a 3-term seq
    assert (ray_df["n_tools"] > 1).any()
    _cmp(ray_df, duck_df)


def _brute_sequence(df: pd.DataFrame, pattern, within_us):
    """Row-at-a-time reference implementation."""
    out = []
    for conv, g in df.sort_values(["conv_id", "turn_idx"]).groupby("conv_id"):
        roles = g["role"].tolist()
        ts = ts_us_series(g["ts"])
        tix = g["turn_idx"].tolist()
        L = len(pattern)
        for i in range(len(roles) - L + 1):
            span = max(ts[i:i + L]) - min(ts[i:i + L])
            if all(roles[i + j] == pattern[j] for j in range(L)) \
                    and tix[i + L - 1] - tix[i] == L - 1 and span <= within_us:
                out.append((conv, tix[i], int(span)))
    return sorted(out)


def test_cep_sequence_bruteforce_and_partition_invariance(sf_dir):
    """Vectorized matcher == brute force; result identical at P=1 and P=5
    (partitioning must not create or lose matches)."""
    ds = derive_transcripts(sf_dir, num_partitions=4)
    df = ds.to_pandas()
    pattern = ("user", "user")
    within = 86_400_000_000
    want = _brute_sequence(df, pattern, within)
    for parts in (1, 5):
        got = sequence_matches(ds, pattern, within,
                               num_partitions=parts).to_pandas()
        got_t = sorted(zip(got["conv_id"], got["turn_idx"].astype(int),
                           got["dt_us"].astype(int)))
        assert got_t == want, parts
    assert len(want) > 0


def test_cep_predicated_sequence_matches_sql_and_partition_invariance(sf_dir):
    """Per-term predicates (text regex + tool equality) vs the oracle, and
    identical output at P=1 / P=5."""
    from pdf_watermark_remover_ray.stages.cep import (
        Term, predicated_sequence_matches)

    want = _duck(sf_dir, Q.oracle_sql()["cep_pred_funnel"])
    assert len(want) > 0  # predicates leave real matches in the fixture
    terms = (Term(role="user", text_regex=Q.CEP_TEXT_REGEX),
             Term(role="tool", tool="error"),
             Term(role="assistant"))
    base = Q.q_cep_pred_funnel(sf_dir).to_pandas()
    _cmp(base, want)
    # predicates genuinely prune: stricter than the plain role funnel
    plain = _duck(sf_dir, Q.oracle_sql()["cep_funnel"])
    assert len(base) < len(plain)
    ds = derive_transcripts(sf_dir, num_partitions=4)
    for parts in (1, 5):
        got = predicated_sequence_matches(ds, terms, Q.CEP_WITHIN_US,
                                          num_partitions=parts).to_pandas()
        _cmp(got, want)


def test_cep_followed_by_matches_sql_and_planted(sf_dir):
    """Non-contiguous A ... B vs the min-over-qualifying oracle, plus a
    planted conv proving gaps are allowed, the EARLIEST match defines dt_us,
    and out-of-window/cross-conv matches don't count."""
    import ray.data

    from pdf_watermark_remover_ray.stages.cep import Term, followed_by_matches

    got = Q.queries()["cep_followed_by"](sf_dir).to_pandas()
    want = duck_sql(sf_dir, Q.oracle_sql()["cep_followed_by"])
    assert len(got) > 0
    _cmp(got, want)

    base = pd.Timestamp("2024-01-01").value // 1000
    W = 1_000_000  # 1 s window
    df = pd.DataFrame({
        "conv_id": ["c1", "c1", "c1", "c1", "c2", "c3"],
        "turn_idx": np.int32([0, 1, 2, 3, 0, 0]),
        "role": ["user", "assistant", "tool", "tool", "user", "tool"],
        "text": [""] * 6,
        "tool": ["", "", "purchase", "purchase", "", "purchase"],
        # c1 u0: two purchases in-window with a non-matching turn between —
        # dt_us must be to the EARLIEST (+0.4 s); c2's user sees only another
        # conversation's purchase (no match)
        "ts": pd.to_datetime([base, base + 200_000, base + 400_000,
                              base + 900_000, base, base + 100_000],
                             unit="us"),
    })
    out = followed_by_matches(ray.data.from_pandas(df),
                              first=Term(role="user"),
                              then=Term(role="tool", tool="purchase"),
                              within_us=W, num_partitions=2).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert (r["conv_id"], int(r["turn_idx"]), int(r["dt_us"])) == ("c1", 0, 400_000)


def test_cep_kleene_maximality():
    """A planted conversation: user tool tool tool assistant → ONE match of
    n_tools=3; an unbracketed tool run emits nothing."""
    import ray.data

    ts = pd.to_datetime(np.arange(10) * 60_000_000, unit="us")
    df = pd.DataFrame({
        "conv_id": ["a"] * 5 + ["b"] * 5,
        "turn_idx": np.tile(np.arange(5, dtype=np.int32), 2),
        "role": ["user", "tool", "tool", "tool", "assistant",
                 # b: tool run touching the conv start — no user bracket
                 "tool", "tool", "assistant", "user", "tool"],
        "text": [""] * 10,
        "tool": [""] * 10,
        "ts": ts,
    })
    got = kleene_matches(ray.data.from_pandas(df), 86_400_000_000,
                         num_partitions=2).to_pandas()
    assert len(got) == 1
    r = got.iloc[0]
    assert (r["conv_id"], int(r["turn_idx"]), int(r["n_tools"])) == ("a", 0, 3)
    assert int(r["dt_us"]) == 4 * 60_000_000


def test_cep_timeouts_matches_sql_and_planted(sf_dir):
    """Negation pattern vs the NOT EXISTS oracle, plus a planted conv:
    an in-window assistant clears the trigger, an out-of-window one
    doesn't, a cross-conversation assistant never clears."""
    import ray.data

    from pdf_watermark_remover_ray.stages.cep import absence_matches

    got = Q.queries()["cep_timeouts"](sf_dir).to_pandas()
    want = duck_sql(sf_dir, Q.oracle_sql()["cep_timeouts"])
    _cmp(got, want)

    base = pd.Timestamp("2024-01-01").value // 1000
    W = 1_000_000  # 1 s window
    df = pd.DataFrame({
        "conv_id": ["c1", "c1", "c1", "c1", "c2", "c3"],
        "turn_idx": np.int32([0, 1, 2, 3, 0, 0]),
        "role": ["user", "assistant", "user", "assistant", "user", "assistant"],
        # u0 cleared by a@+0.5s; u2 NOT cleared (next a at +2s); c2's user
        # never cleared (c3's assistant is another conversation)
        "ts": pd.to_datetime([base, base + 500_000, base + 1_000_000,
                              base + 3_000_000, base, base],
                             unit="us"),
    })
    out = absence_matches(ray.data.from_pandas(df), W, num_partitions=2) \
        .to_pandas().sort_values(["conv_id", "turn_idx"])
    assert list(zip(out["conv_id"], out["turn_idx"])) == [("c1", 2), ("c2", 0)]
    assert (out["deadline_us"].to_numpy()
            == np.array([base + 1_000_000 + W, base + W])).all()
