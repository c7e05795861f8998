"""Round-4 session-3 operators: the remaining TPC-H join shapes (Q4 EXISTS
semijoin, Q8 market-share fraction, Q13 count-of-counts distribution, Q15
argmax-with-ties, Q21 correlated EXISTS+NOT-EXISTS on one fact table, Q22
anti-join + global scalar subquery)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from pdf_watermark_remover_ray.pipelines import queries as Q

from conftest import assert_frames_match as _cmp
from conftest import duck_sql


@pytest.mark.parametrize("name,tables", [
    ("q4_order_priority", ("lineitem", "orders")),
    ("q8_market_share", ("lineitem", "orders", "customer", "supplier",
                         "part", "nation", "region")),
    ("q13_custdist", ("orders", "customer")),
    ("q15_top_supplier", ("lineitem", "supplier")),
    ("q21_waiting_suppliers", ("lineitem", "orders", "supplier")),
    ("q22_global_sales", ("customer", "orders")),
])
def test_session3_relational_matches_sql(sf_dir, name, tables):
    got = Q.queries()[name](sf_dir)
    got = got.to_pandas() if hasattr(got, "to_pandas") else got
    want = duck_sql(sf_dir, Q.oracle_sql()[name], tables=tables)
    assert len(want) > 0, name  # fixture must exercise the operator
    _cmp(got, want)


def test_q13_zero_order_customers_counted(sf_dir):
    """The join-free LEFT OUTER: total distribution mass == |customers|
    (every customer lands in exactly one bucket, including c_count=0)."""
    import pyarrow.parquet as pq

    out = Q.queries()["q13_custdist"](sf_dir)
    n_cust = pq.read_metadata(f"{sf_dir}/customer.parquet").num_rows
    assert int(out["custdist"].sum()) == n_cust


def test_q15_ties_are_all_returned():
    """Planted fixture where TWO suppliers tie on max revenue — both rows
    must come back (argmax-with-ties, not LIMIT 1)."""
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    from pdf_watermark_remover_ray.pipelines.relational import q15_top_supplier

    with tempfile.TemporaryDirectory() as d:
        ts = pd.Timestamp("1996-02-01")
        pq.write_table(pa.table({
            "l_suppkey": pa.array([1, 1, 2, 3], pa.int64()),
            "l_shipdate": pa.array([ts] * 4, pa.timestamp("us")),
            "l_extendedprice": pa.array([50.0, 50.0, 100.0, 10.0]),
            "l_discount": pa.array([0.0, 0.0, 0.0, 0.0]),
        }), f"{d}/lineitem.parquet")
        pq.write_table(pa.table({
            "s_suppkey": pa.array([1, 2, 3], pa.int64()),
            "s_name": pa.array(["s1", "s2", "s3"]),
        }), f"{d}/supplier.parquet")
        out = q15_top_supplier(d)
        assert list(out["s_suppkey"]) == [1, 2]
        assert list(out["total_revenue"]) == [100.0, 100.0]


def test_q21_sole_problem_supplier_semantics():
    """Planted orders: multi-supplier order with ONE problem supplier counts;
    single-supplier problem orders and two-problem-supplier orders don't."""
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    from pdf_watermark_remover_ray.pipelines.relational import (
        q21_waiting_suppliers)

    with tempfile.TemporaryDirectory() as d:
        # order 1: supp 1 problem, supp 2 clean  -> supp 1 counts
        # order 2: supp 1 problem, single-supplier -> excluded (n_supp < 2)
        # order 3: supp 1 AND supp 2 problem -> excluded (n_prob != 1)
        # order 4: status 'O' (not finished) -> excluded entirely
        pq.write_table(pa.table({
            "l_orderkey": pa.array([1, 1, 2, 3, 3, 4, 4], pa.int64()),
            "l_suppkey": pa.array([1, 2, 1, 1, 2, 1, 2], pa.int64()),
            "l_returnflag": pa.array(["R", "N", "R", "R", "R", "R", "N"]),
        }), f"{d}/lineitem.parquet")
        pq.write_table(pa.table({
            "o_orderkey": pa.array([1, 2, 3, 4], pa.int64()),
            "o_orderstatus": pa.array(["F", "F", "F", "O"]),
        }), f"{d}/orders.parquet")
        pq.write_table(pa.table({
            "s_suppkey": pa.array([1, 2], pa.int64()),
            "s_name": pa.array(["s1", "s2"]),
        }), f"{d}/supplier.parquet")
        out = q21_waiting_suppliers(d)
        assert list(out["s_name"]) == ["s1"]
        assert list(out["numwait"]) == [1]


def test_session3_ops_on_empty_tables(tmp_path):
    """P4 pass-through: zero-row inputs with canonical schemas produce
    zero-row (or schema-stable) outputs, never an empty-broadcast crash."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from test_round4_ops import _write_empty_tables

    d = str(tmp_path)
    _write_empty_tables(d)
    pq.write_table(pa.table({
        "s_suppkey": pa.array([], pa.int64()),
        "s_name": pa.array([], pa.string()),
        "s_nationkey": pa.array([], pa.int64()),
        "s_acctbal": pa.array([], pa.float64())}), f"{d}/supplier.parquet")
    pq.write_table(pa.table({
        "n_nationkey": pa.array([], pa.int64()),
        "n_name": pa.array([], pa.string()),
        "n_regionkey": pa.array([], pa.int64())}), f"{d}/nation.parquet")

    from pdf_watermark_remover_ray.pipelines.relational import (
        q4_order_priority, q8_market_share, q13_custdist, q15_top_supplier,
        q21_waiting_suppliers, q22_global_sales)

    for fn in (q4_order_priority, q8_market_share, q13_custdist,
               q15_top_supplier, q21_waiting_suppliers, q22_global_sales):
        out = fn(d)
        assert len(out) == 0, fn.__name__
        assert len(out.columns) > 0, fn.__name__  # typed empty frame


@pytest.mark.parametrize("name,tables", [
    ("bm25_topk", ("documents",)),
    ("semantic_dedup", ("embeddings",)),
])
def test_session3_llm_ops_match_sql(sf_dir, name, tables):
    got = Q.queries()[name](sf_dir)
    got = got.to_pandas() if hasattr(got, "to_pandas") else got
    want = duck_sql(sf_dir, Q.oracle_sql()[name], tables=tables)
    assert len(want) > 0, name
    _cmp(got, want)


def test_bm25_rank_semantics(sf_dir):
    """Per query: ranks are 1..n (n ≤ k), scores non-increasing, and the
    doc_id tiebreak is ascending within equal scores."""
    out = Q.queries()["bm25_topk"](sf_dir)
    for qid, g in out.groupby("query_id"):
        assert list(g["rank"]) == list(range(1, len(g) + 1))
        assert len(g) <= 10
        s = g["score"].to_numpy()
        assert (np.diff(s) <= 0).all()
        for _, tie in g.groupby("score"):
            assert tie["doc_id"].is_monotonic_increasing


def test_semantic_dedup_transitive_and_total():
    """Planted chain A≈B≈C (A !≈ C directly) must collapse to ONE
    component; orthogonal D stays a kept singleton; every vector appears
    exactly once."""
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    from pdf_watermark_remover_ray.pipelines.dedup import semantic_dedup

    a = np.array([1.0, 0.0, 0.0, 0.0])
    b = np.array([0.8, 0.6, 0.0, 0.0])          # cos(a,b)=0.8, cos(b,c)=0.6
    c = np.array([0.0, 1.0, 0.0, 0.0])          # cos(a,c)=0.0 < θ
    d = np.array([0.0, 0.0, 0.0, 1.0])
    with tempfile.TemporaryDirectory() as tdir:
        pq.write_table(pa.table({
            "vec_id": pa.array([10, 11, 12, 13], pa.int64()),
            "embedding": pa.array([list(map(float, v))
                                   for v in (a, b, c, d)],
                                  pa.list_(pa.float32())),
            "label": pa.array([0, 0, 0, 0], pa.int32()),
        }), f"{tdir}/embeddings.parquet")
        out = semantic_dedup(tdir, threshold=0.5)
        assert list(out["vec_id"]) == [10, 11, 12, 13]
        assert list(out["rep_id"]) == [10, 10, 10, 13]  # chain collapsed
        assert list(out["kept"]) == [True, False, False, True]


def test_bm25_indexed_equals_inline(sf_dir, tmp_path):
    """The indexed path must return EXACTLY the inline path's rows (same
    oracle contract), and the index must be reusable (second query run
    skips the build via the done marker)."""
    from pdf_watermark_remover_ray.pipelines.text import (
        bm25_topk, bm25_topk_indexed)

    idx = str(tmp_path / "bm25_idx")
    a = bm25_topk(sf_dir).reset_index(drop=True)
    b1 = bm25_topk_indexed(sf_dir, index_dir=idx).reset_index(drop=True)
    b2 = bm25_topk_indexed(sf_dir, index_dir=idx).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b1)
    pd.testing.assert_frame_equal(b1, b2)


@pytest.mark.parametrize("name,tables", [
    ("latest_user_event", ("events",)),
    ("order_price_ntile", ("orders",)),
    ("quality_percentile_filter", ("documents",)),
])
def test_session3b_matches_sql(sf_dir, name, tables):
    got = Q.queries()[name](sf_dir)
    got = got.to_pandas() if hasattr(got, "to_pandas") else got
    want = duck_sql(sf_dir, Q.oracle_sql()[name], tables=tables)
    assert len(want) > 0, name
    _cmp(got, want)


def test_ntile_bucket_sizes(sf_dir):
    """DuckDB NTILE fill rule: first (N % n) tiles get ceil(N/n) rows."""
    import pyarrow.parquet as pq

    out = Q.queries()["order_price_ntile"](sf_dir)
    out = out.to_pandas() if hasattr(out, "to_pandas") else out
    n_rows = pq.read_metadata(f"{sf_dir}/orders.parquet").num_rows
    sizes = out["tile"].value_counts().sort_index()
    base, extra = divmod(n_rows, 4)
    want = [base + 1] * extra + [base] * (4 - extra)
    assert list(sizes) == want


def test_latest_user_event_is_argmax(sf_dir):
    """One row per user; each row's ts is that user's max event ts."""
    import duckdb

    out = Q.queries()["latest_user_event"](sf_dir)
    out = out.to_pandas() if hasattr(out, "to_pandas") else out
    assert out["user_id"].is_unique
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{sf_dir}/events.parquet')")
    mx = con.sql("SELECT user_id, max(ts) AS mts FROM events "
                 "WHERE user_id IS NOT NULL GROUP BY user_id").df()
    m = out.merge(mx, on="user_id")
    assert (m["ts"] == m["mts"]).all()
