"""Range join / session labels / moving window sum: oracles + invariants."""

from __future__ import annotations

import numpy as np
import pandas as pd

from pdf_watermark_remover_ray.pipelines import queries as Q
from pdf_watermark_remover_ray.sources.transcripts import derive_transcripts
from pdf_watermark_remover_ray.stages.join import range_join, stream_join
from pdf_watermark_remover_ray.stages.windows import session_labels, session_windows

GAP_US = Q.GAP_US


from conftest import duck_sql


def _duck(sf_dir: str, sql: str) -> pd.DataFrame:
    return duck_sql(sf_dir, sql, tables=("events", "orders"))


def test_range_join_superset_of_asof(sf_dir):
    """Every as-of match is a range pair; range pairs all satisfy the gap."""
    ds = derive_transcripts(sf_dir, num_partitions=4)
    rj = range_join(ds, GAP_US, num_partitions=4).to_pandas()
    sj = stream_join(ds, GAP_US, num_partitions=4).to_pandas()
    key = ["conv_id", "user_turn_idx", "tool_turn_idx"]
    rset = set(map(tuple, rj[key].itertuples(index=False)))
    assert len(rj) >= len(sj) > 0
    for row in sj[key].itertuples(index=False):
        assert tuple(row) in rset
    assert ((rj["dt_us"] >= 0) & (rj["dt_us"] <= GAP_US)).all()
    duck = _duck(sf_dir, Q.oracle_sql()["range_join"])
    assert len(duck) == len(rj)


def test_session_labels_consistent_with_session_windows(sf_dir):
    """Per-turn labels aggregate back to the session windows: same number of
    sessions per conversation, same per-session turn counts."""
    ds = derive_transcripts(sf_dir, num_partitions=4)
    labels = session_labels(ds, GAP_US, num_partitions=4).to_pandas()
    wins = session_windows(ds, GAP_US, num_partitions=4).to_pandas()
    per_conv_sessions = labels.groupby("conv_id")["session_id"].nunique()
    per_conv_windows = wins.groupby("conv_id").size()
    assert per_conv_sessions.sort_index().equals(per_conv_windows.sort_index())
    counts_lbl = labels.groupby(["conv_id", "session_id"]).size() \
        .reset_index(name="n").sort_values(["conv_id", "session_id"])
    counts_win = wins.sort_values(["conv_id", "session_start_us"])
    assert counts_lbl["n"].to_numpy().tolist() == \
        counts_win["n_turns"].to_numpy().tolist()
    # labels are 0-based and dense per conversation
    mx = labels.groupby("conv_id")["session_id"].agg(["min", "max", "nunique"])
    assert (mx["min"] == 0).all()
    assert (mx["max"] == mx["nunique"] - 1).all()


def test_moving_revenue_sum_bruteforce(sf_dir):
    got = Q.queries()["moving_revenue_sum"](sf_dir).to_pandas()
    import pyarrow.parquet as pq

    o = pq.read_table(f"{sf_dir}/orders.parquet",
                      columns=["o_orderkey", "o_custkey", "o_orderdate",
                               "o_totalprice"]).to_pandas()
    o = o.sort_values(["o_custkey", "o_orderdate", "o_orderkey"])
    want = o.groupby("o_custkey")["o_totalprice"] \
        .rolling(3, min_periods=1).sum().reset_index(level=0, drop=True)
    merged = got.set_index("o_orderkey")
    o = o.assign(want=np.round(want.to_numpy(), 2)).set_index("o_orderkey")
    j = merged.join(o[["want"]])
    assert np.allclose(j["moving_sum"], j["want"])


def test_events_orders_asof_matches_sql(sf_dir):
    """Two-table as-of join vs the DuckDB QUALIFY row_number oracle, plus the
    inner-asof invariants (lag non-negative, one row per matched event)."""
    from conftest import assert_frames_match

    got = Q.queries()["events_orders_asof"](sf_dir).to_pandas()
    want = _duck(sf_dir, Q.oracle_sql()["events_orders_asof"])
    assert_frames_match(got, want)
    assert (got["lag_us"] >= 0).all()
    assert got["event_id"].is_unique


def test_asof_join_tables_tie_break():
    """Equal right timestamps resolve to the largest tie column (merge_asof
    last-in-sort-order rule the oracle mirrors with ORDER BY tie DESC)."""
    import ray.data

    from pdf_watermark_remover_ray.stages.join import asof_join_tables

    left = pd.DataFrame({"k": np.int64([1, 1, 2]),
                         "ts_us": np.int64([100, 5, 100]),
                         "lid": np.int64([10, 11, 12])})
    right = pd.DataFrame({"k": np.int64([1, 1, 1, 2]),
                          "ts_us": np.int64([50, 50, 200, 90]),
                          "rid": np.int64([7, 9, 8, 3])})
    out = asof_join_tables(
        ray.data.from_pandas(left), ray.data.from_pandas(right),
        key="k", left_cols=["lid"], right_cols=["rid"], right_tie="rid",
        num_partitions=3).to_pandas().sort_values("lid")
    # lid=10 matches ts 50 twice -> tie to rid=9; lid=11 has no match <= 5;
    # lid=12 matches rid=3
    assert out["lid"].tolist() == [10, 12]
    assert out["rid"].tolist() == [9, 3]
    assert out["lag_us"].tolist() == [50, 10]


def test_asof_join_tables_large_int64_payload_exact():
    """Payload values at/above 2^53 survive the join bit-exactly — the
    union's null promotion must NOT round-trip int64 through float64
    (2^53 + 1 is the first integer float64 cannot represent)."""
    import ray.data

    from pdf_watermark_remover_ray.stages.join import asof_join_tables

    big = np.int64(2**53 + 1)
    left = pd.DataFrame({"k": np.int64([1, 1]),
                         "ts_us": np.int64([100, 200]),
                         "lid": np.int64([big, big + 2])})
    right = pd.DataFrame({"k": np.int64([1]),
                          "ts_us": np.int64([50]),
                          "rid": np.int64([big + 4])})
    out = asof_join_tables(
        ray.data.from_pandas(left), ray.data.from_pandas(right),
        key="k", left_cols=["lid"], right_cols=["rid"], right_tie="rid",
        num_partitions=2).to_pandas().sort_values("lid")
    assert out["lid"].tolist() == [int(big), int(big) + 2]
    assert out["rid"].tolist() == [int(big) + 4, int(big) + 4]


def test_q3_join_fallback_matches_broadcast(sf_dir):
    """Both sides of the q3 broadcast-size guard produce identical oracle
    results: threshold 0 forces the Dataset.join semijoin path, the default
    threshold takes the broadcast np.isin path."""
    from conftest import assert_frames_match

    from pdf_watermark_remover_ray.pipelines.relational import q3_top_orders

    want = duck_sql(sf_dir, Q.oracle_sql()["q3_top_orders"],
                    tables=("customer", "orders", "lineitem"))
    got_join = q3_top_orders(sf_dir, broadcast_threshold=0)
    assert_frames_match(got_join, want)
    got_bcast = q3_top_orders(sf_dir)
    assert_frames_match(got_bcast, want)


def test_cohort_retention_matches_sql(sf_dir):
    from conftest import assert_frames_match

    got = Q.queries()["cohort_retention"](sf_dir).to_pandas()
    want = _duck(sf_dir, Q.oracle_sql()["cohort_retention"])
    assert_frames_match(got, want)
    # period 0 of each cohort counts every user whose first event is in it —
    # retention periods can never exceed it
    p0 = got[got["period"] == 0].set_index("cohort")["n_users"]
    for _, r in got.iterrows():
        assert r["n_users"] <= p0[r["cohort"]]


def test_user_daily_activity_matches_sql_and_gapfills(sf_dir):
    from conftest import assert_frames_match

    got = Q.queries()["user_daily_activity"](sf_dir).to_pandas()
    want = _duck(sf_dir, Q.oracle_sql()["user_daily_activity"])
    assert_frames_match(got, want)
    # densification really fills gaps: every user's day sequence is
    # contiguous, and at least one zero-count day exists in the fixture
    for _, g in got.groupby("user_id"):
        d = np.sort(g["day"].to_numpy())
        assert (np.diff(d) == 1).all()
    assert (got["n_events"] == 0).any()
