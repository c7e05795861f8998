"""Round-4 operators: TPC-H Q14/Q17/Q18/Q19 shapes, EXCEPT set op,
Bloom-filtered semijoin."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from pdf_watermark_remover_ray.pipelines import queries as Q

from conftest import assert_frames_match as _cmp
from conftest import duck_sql


@pytest.mark.parametrize("name,tables", [
    ("q14_promo_revenue", ("lineitem", "part")),
    ("q17_small_qty_revenue", ("lineitem", "part")),
    ("q18_large_orders", ("lineitem", "orders", "customer")),
    ("q19_disjunctive_revenue", ("lineitem", "part")),
    ("customers_without_events", ("orders", "events")),
    ("bloom_semijoin_revenue", ("lineitem", "supplier")),
])
def test_round4_relational_matches_sql(sf_dir, name, tables):
    got = Q.queries()[name](sf_dir)
    got = got.to_pandas() if hasattr(got, "to_pandas") else got
    want = duck_sql(sf_dir, Q.oracle_sql()[name], tables=tables)
    assert len(want) > 0  # every fixture exercises the operator
    _cmp(got, want)


def test_bloom_filter_properties():
    """No false negatives ever; false-positive rate small at design load;
    merge(OR) == build-on-union."""
    from pdf_watermark_remover_ray.functions.bloom import Bloom

    rng = np.random.default_rng(7)
    members = rng.choice(1 << 40, size=2000, replace=False).astype(np.int64)
    others = rng.choice(1 << 40, size=20000, replace=False).astype(np.int64)
    others = others[~np.isin(others, members)]
    b = Bloom(m_bits=1 << 16, k=4)
    b.add(members)
    assert b.contains(members).all()  # NO false negatives
    fp = b.contains(others).mean()
    assert fp < 0.02, fp  # ~2k keys in 64k bits, k=4 → well under 2%

    half1, half2 = members[:1000], members[1000:]
    b1 = Bloom(m_bits=1 << 16, k=4)
    b1.add(half1)
    b2 = Bloom(m_bits=1 << 16, k=4)
    b2.add(half2)
    assert (b1.merge(b2).bits == b.bits).all()  # mergeable partial


def test_bloom_semijoin_fp_killed_by_verify(sf_dir):
    """Degenerate bloom (every probe positive: m tiny) must STILL give the
    exact answer — the verify stage owns correctness, the bloom only prunes."""
    from pdf_watermark_remover_ray.pipelines.relational import (
        bloom_semijoin_oracle_sql, bloom_semijoin_revenue)

    got = bloom_semijoin_revenue(sf_dir, m_bits=8).to_pandas()  # all-FP bloom
    want = duck_sql(sf_dir, bloom_semijoin_oracle_sql(),
                    tables=("lineitem", "supplier"))
    _cmp(got, want)


def test_q18_threshold_selectivity(sf_dir):
    """The HAVING filter leaves a small broadcastable key set (the scale
    assumption the decorate stage relies on)."""
    import duckdb

    got = Q.queries()["q18_large_orders"](sf_dir)
    con = duckdb.connect()
    n_orders = con.sql(
        f"SELECT count(*) FROM read_parquet('{sf_dir}/orders.parquet')"
    ).fetchone()[0]
    con.close()
    assert 0 < len(got) < 0.15 * n_orders


@pytest.mark.parametrize("name,tables", [
    ("dedup_turns", ("events",)),
    ("pii_redacted_turns", ("events",)),
    ("repetition_scores", ("documents",)),
    ("cms_user_counts", ("events",)),
])
def test_round4_text_sketch_matches_sql(sf_dir, name, tables):
    got = Q.queries()[name](sf_dir)
    got = got.to_pandas() if hasattr(got, "to_pandas") else got
    want = duck_sql(sf_dir, Q.oracle_sql()[name], tables=tables)
    assert len(want) > 0
    _cmp(got, want)


def test_dedup_turns_prunes_and_keeps_first(sf_dir):
    """Duplicated texts exist in the fixture (the op is exercised), and the
    survivor of each text is the (ts, conv, turn)-earliest occurrence."""
    from pdf_watermark_remover_ray.sources.transcripts import derive_transcripts
    from pdf_watermark_remover_ray.stages.windows import ts_us_series

    full = derive_transcripts(sf_dir).to_pandas()
    kept = Q.queries()["dedup_turns"](sf_dir).to_pandas()
    assert 0 < len(kept) < len(full)  # real pruning
    assert kept["conv_id"].size == kept.drop_duplicates().shape[0]
    full = full.assign(ts_us=ts_us_series(full["ts"]))
    first = full.sort_values(["ts_us", "conv_id", "turn_idx"],
                             kind="mergesort") \
        .groupby(full["text"].fillna(""), sort=False).head(1)
    want = set(zip(first["conv_id"], first["turn_idx"].astype(int)))
    got = set(zip(kept["conv_id"], kept["turn_idx"].astype(int)))
    assert got == want


def test_pii_redactor_planted():
    """Emails, phones, and digit runs redact in rule order (an email's
    digits never double-count as <NUM>)."""
    from pdf_watermark_remover_ray.pipelines.text import PIIRedactor

    df = pd.DataFrame({
        "conv_id": ["a"] * 4,
        "turn_idx": np.int32([0, 1, 2, 3]),
        "text": ["mail bob42@test.org now", "call 555-123-4567 ok",
                 "k=99 and 12345", None],
    })
    out = PIIRedactor()(df)
    assert list(out["clean_text"]) == [
        "mail <EMAIL> now", "call <PHONE> ok", "k=<NUM> and <NUM>", ""]
    assert list(out["n_redactions"]) == [1, 1, 2, 0]


def test_repetition_scores_bruteforce(sf_dir):
    """Vectorized scores == row-at-a-time reference on real docs."""
    import collections

    import pyarrow.parquet as pq

    docs = pq.read_table(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()
    got = Q.queries()["repetition_scores"](sf_dir).to_pandas() \
        .set_index("doc_id").sort_index()
    exercised = 0
    for _, row in docs.head(200).iterrows():
        toks = (row["text"] or "").split()
        n = len(toks)
        dup = 1 - len(set(toks)) / n if n else 0.0
        bgs = collections.Counter(zip(toks, toks[1:]))
        top = max(bgs.values()) / (n - 1) if n > 1 else 0.0
        g = got.loc[row["doc_id"]]
        assert abs(g["dup_word_frac"] - dup) < 1e-6
        assert abs(g["top_bigram_frac"] - top) < 1e-6
        exercised += dup > 0
    assert exercised > 0


def test_cms_never_underestimates(sf_dir):
    """CMS property: est_count >= exact count for EVERY user (and equals it
    for most at this load factor)."""
    import duckdb

    est = Q.queries()["cms_user_counts"](sf_dir).to_pandas()
    con = duckdb.connect()
    exact = con.sql(
        f"SELECT user_id, count(*) AS c FROM "
        f"read_parquet('{sf_dir}/events.parquet') GROUP BY user_id").df()
    con.close()
    m = est.merge(exact, on="user_id", how="outer")
    assert m.notna().all().all()  # same user set
    assert (m["est_count"] >= m["c"]).all()


@pytest.mark.parametrize("name,tables", [
    ("collapse_repeat_turns", ("events",)),
    ("normalized_docs", ("documents",)),
    ("user_activity_outer", ("events", "orders")),
    ("capped_sample_per_group", ("documents",)),
])
def test_round4b_matches_sql(sf_dir, name, tables):
    got = Q.queries()[name](sf_dir)
    got = got.to_pandas() if hasattr(got, "to_pandas") else got
    want = duck_sql(sf_dir, Q.oracle_sql()[name], tables=tables)
    assert len(want) > 0
    _cmp(got, want)


def test_capped_sample_prunes_and_is_partition_invariant(sf_dir):
    """The cap actually fires, every surviving cell is <= cap, and the hash-
    order selection is identical at P=1 and P=5."""
    import duckdb

    from pdf_watermark_remover_ray.functions.sampling import (
        capped_sample_per_group)

    con = duckdb.connect()
    total = con.sql(f"SELECT count(*) FROM "
                    f"read_parquet('{sf_dir}/documents.parquet')").fetchone()[0]
    con.close()
    base = capped_sample_per_group(sf_dir).to_pandas()
    assert len(base) < total  # cap fired
    assert base.groupby(["lang", "source"]).size().max() <= 3
    for parts in (1, 5):
        got = capped_sample_per_group(sf_dir, num_partitions=parts).to_pandas()
        assert sorted(got["doc_id"]) == sorted(base["doc_id"])


def test_user_activity_outer_has_both_null_sides(sf_dir):
    """FULL OUTER semantics exercised: rows exist with NULL n_events (order-
    only users).  All event users also order in the fixture, so assert the
    engine emits the asymmetric side and never drops a user."""
    got = Q.queries()["user_activity_outer"](sf_dir).to_pandas()
    assert got["n_events"].isna().any()
    assert got["n_orders"].notna().all()
    assert got["user_id"].is_unique


def test_collapse_repeats_planted():
    """Consecutive equal texts collapse; equal texts with a gap, across
    convs, or non-adjacent turn_idx survive."""
    import ray.data

    from pdf_watermark_remover_ray.pipelines.text import collapse_repeat_turns

    ts = pd.to_datetime(np.arange(6) * 1_000_000, unit="us")
    df = pd.DataFrame({
        "conv_id": ["a", "a", "a", "a", "b", "b"],
        "turn_idx": np.int32([0, 1, 2, 4, 0, 1]),
        # a1 == a0 (drop), a2 != a1 (keep), a4 == a2 BUT turn gap (keep),
        # b0 == a0 but other conv (keep), b1 == b0 (drop)
        "text": ["x", "x", "y", "y", "x", "x"],
        "role": ["user"] * 6, "tool": [""] * 6, "ts": ts,
    })
    out = collapse_repeat_turns(ray.data.from_pandas(df), num_partitions=2) \
        .to_pandas()
    got = sorted(zip(out["conv_id"], out["turn_idx"].astype(int)))
    assert got == [("a", 0), ("a", 2), ("a", 4), ("b", 0)]


@pytest.mark.parametrize("name,tables", [
    ("events_window_distinct", ("events",)),
    ("top_customers_with_ties", ("orders",)),
    ("orders_yoy_growth", ("orders",)),
])
def test_round4c_matches_sql(sf_dir, name, tables):
    got = Q.queries()[name](sf_dir)
    got = got.to_pandas() if hasattr(got, "to_pandas") else got
    want = duck_sql(sf_dir, Q.oracle_sql()[name], tables=tables)
    assert len(want) > 0
    _cmp(got, want)


def test_top_customers_ties_semantics(sf_dir):
    """DENSE_RANK <= k keeps ALL boundary ties and exactly k distinct
    count values."""
    got = Q.queries()["top_customers_with_ties"](sf_dir).to_pandas()
    assert got["rnk"].max() <= 3 and got["n_orders"].nunique() <= 3
    # rank is constant within a count value and ordered by it
    m = got.groupby("n_orders")["rnk"].nunique()
    assert (m == 1).all()
    by_rank = got.groupby("rnk")["n_orders"].first().sort_index()
    assert by_rank.is_monotonic_decreasing


def test_dup_spans_matches_sql_and_planted(sf_dir):
    """Exact duplicated-substring spans vs the gaps-and-islands oracle, plus
    a planted corpus: a 40-char block shared by two docs yields exactly one
    maximal span per doc covering the block; a unique doc yields nothing."""
    import ray.data

    from pdf_watermark_remover_ray.pipelines.dedup import (
        dup_spans, dup_spans_oracle_sql)

    got = Q.queries()["dup_spans"](sf_dir).to_pandas()
    want = duck_sql(sf_dir, Q.oracle_sql()["dup_spans"], tables=("documents",))
    assert len(want) > 0
    _cmp(got, want)

    block = "XYZQWERTYUIOPASDFGHJKLZXCVBNM0123456789!"  # 40 chars, unique
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    with tempfile.TemporaryDirectory() as d:
        pq.write_table(pa.table({
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array([f"aaa {block} bbb", f"ccc {block}",
                              "totally unique text with no repeats at all"]),
        }), f"{d}/documents.parquet")
        spans = dup_spans(d, L=16).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        # docs 1 and 2 each have ONE maximal span; the shared region is the
        # planted block plus the preceding space (" "+block is itself a
        # shared 16-gram prefix), identical text in both docs
        assert list(spans["doc_id"]) == [1, 2]
        s1, s2 = spans.iloc[0], spans.iloc[1]
        t1 = f"aaa {block} bbb"[s1["span_start"] - 1:s1["span_end"]]
        t2 = f"ccc {block}"[s2["span_start"] - 1:s2["span_end"]]
        assert t1 == t2 == " " + block


def test_curate_corpus_matches_sql_and_composition(sf_dir):
    """The composed pipeline equals its SQL replay AND its own parts: every
    surviving doc passes quality_filter, and there is exactly one survivor
    per distinct kept text."""
    got = Q.queries()["curate_corpus"](sf_dir).to_pandas()
    want = duck_sql(sf_dir, Q.oracle_sql()["curate_corpus"],
                    tables=("documents",))
    assert 0 < len(want)
    _cmp(got, want)
    qf = Q.queries()["quality_filter"](sf_dir).to_pandas()
    kept = set(qf.loc[qf["keep"], "doc_id"])
    assert set(got["doc_id"]).issubset(kept)
    assert len(got) <= len(kept)

    # planted corpus: a KEPT-quality doc duplicated 3x -> min-doc survivor
    # only; a low-quality doc never reaches dedup
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    from pdf_watermark_remover_ray.pipelines.curate import curate_corpus

    good = ("the quick brown fox jumps over a lazy dog and then runs to "
            "the river bank where data stream window join state actor "
            "shuffle partition arrow batch all flow in order")  # 30 words
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(pa.table({
            "doc_id": pa.array([5, 2, 9, 7], pa.int64()),
            "text": pa.array([good, good, good, "too short"]),
        }), f"{d}/documents.parquet")
        out = curate_corpus(d).to_pandas()
        assert list(out["doc_id"]) == [2]  # min doc_id of the kept dupes
        assert int(out["n_tokens"].iloc[0]) == len(good.split())


def test_q6_pushdown_matches_sql(sf_dir):
    got = Q.queries()["q6_forecast_revenue"](sf_dir)
    want = duck_sql(sf_dir, Q.oracle_sql()["q6_forecast_revenue"],
                    tables=("lineitem",))
    assert want["revenue"].iloc[0] > 0
    _cmp(got, want)


def test_q10_returned_items_matches_sql(sf_dir):
    got = Q.queries()["q10_returned_items"](sf_dir)
    want = duck_sql(sf_dir, Q.oracle_sql()["q10_returned_items"],
                    tables=("lineitem", "orders", "customer"))
    assert len(want) == 20
    _cmp(got, want)


def _write_empty_tables(d: str) -> None:
    """Zero-row parquet tables with the canonical testdata schemas."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(pa.table({
        "doc_id": pa.array([], pa.int64()), "text": pa.array([], pa.string()),
        "lang": pa.array([], pa.string()), "source": pa.array([], pa.string()),
        "n_chars": pa.array([], pa.int64())}), f"{d}/documents.parquet")
    pq.write_table(pa.table({
        "event_id": pa.array([], pa.int64()), "user_id": pa.array([], pa.int64()),
        "ts": pa.array([], pa.timestamp("us")),
        "event_type": pa.array([], pa.string()),
        "props": pa.array([], pa.string())}), f"{d}/events.parquet")
    pq.write_table(pa.table({
        "o_orderkey": pa.array([], pa.int64()), "o_custkey": pa.array([], pa.int64()),
        "o_orderstatus": pa.array([], pa.string()),
        "o_totalprice": pa.array([], pa.float64()),
        "o_orderdate": pa.array([], pa.timestamp("us")),
        "o_orderpriority": pa.array([], pa.string())}), f"{d}/orders.parquet")
    pq.write_table(pa.table({
        "l_orderkey": pa.array([], pa.int64()), "l_partkey": pa.array([], pa.int64()),
        "l_suppkey": pa.array([], pa.int64()),
        "l_quantity": pa.array([], pa.float64()),
        "l_extendedprice": pa.array([], pa.float64()),
        "l_discount": pa.array([], pa.float64()),
        "l_returnflag": pa.array([], pa.string()),
        "l_shipdate": pa.array([], pa.timestamp("us"))}),
        f"{d}/lineitem.parquet")
    pq.write_table(pa.table({
        "p_partkey": pa.array([], pa.int64()), "p_brand": pa.array([], pa.string()),
        "p_type": pa.array([], pa.string()),
        "p_size": pa.array([], pa.int32())}), f"{d}/part.parquet")
    pq.write_table(pa.table({
        "c_custkey": pa.array([], pa.int64()), "c_name": pa.array([], pa.string()),
        "c_nationkey": pa.array([], pa.int32()),
        "c_acctbal": pa.array([], pa.float64()),
        "c_mktsegment": pa.array([], pa.string())}), f"{d}/customer.parquet")


def test_round4_ops_on_empty_tables(tmp_path):
    """P4 pass-through discipline for the new ops: zero-row inputs (same
    schemas) produce zero-row outputs, never an exception."""
    d = str(tmp_path)
    _write_empty_tables(d)

    from pdf_watermark_remover_ray.functions.sampling import (
        capped_sample_per_group)
    from pdf_watermark_remover_ray.functions.sketches import cms_user_counts
    from pdf_watermark_remover_ray.pipelines.curate import curate_corpus
    from pdf_watermark_remover_ray.pipelines.dedup import dup_spans
    from pdf_watermark_remover_ray.pipelines.relational import (
        events_window_distinct, orders_yoy_growth, top_customers_with_ties,
        user_activity_outer)
    from pdf_watermark_remover_ray.pipelines.text import (
        normalize_docs, repetition_scores)

    for fn in (repetition_scores, normalize_docs, dup_spans, curate_corpus,
               capped_sample_per_group, cms_user_counts,
               events_window_distinct, top_customers_with_ties,
               user_activity_outer, orders_yoy_growth):
        out = fn(d)
        n = out.count() if hasattr(out, "count") and hasattr(out, "to_pandas") \
            and not isinstance(out, pd.DataFrame) else len(out)
        assert n == 0, fn.__name__

    # TPC-H ops on the same empty tables: set-returning ones give 0 rows,
    # scalar aggregates give their 1-row frame (NaN/0 as documented) —
    # never an IndexError from an empty broadcast side
    from pdf_watermark_remover_ray.pipelines.relational import (
        q6_forecast_revenue, q10_returned_items, q14_promo_revenue,
        q17_small_quantity_revenue, q18_large_orders,
        q19_disjunctive_revenue)

    assert len(q18_large_orders(d)) == 0
    assert len(q10_returned_items(d)) == 0
    for scalar_fn in (q6_forecast_revenue, q14_promo_revenue,
                      q17_small_quantity_revenue, q19_disjunctive_revenue):
        out = scalar_fn(d)
        assert len(out) == 1, scalar_fn.__name__


def test_user_daily_locf_matches_sql_and_fills(sf_dir):
    """LOCF vs the IGNORE-NULLS window oracle; gap days exist and inherit
    the prior value (the fill path is genuinely exercised)."""
    got = Q.queries()["user_daily_locf"](sf_dir).to_pandas()
    want = duck_sql(sf_dir, Q.oracle_sql()["user_daily_locf"],
                    tables=("events",))
    assert len(want) > 0
    _cmp(got, want)
    import duckdb

    con = duckdb.connect()
    observed = con.sql(
        f"SELECT count(DISTINCT (user_id, epoch_us(ts) // 86400000000)) "
        f"FROM read_parquet('{sf_dir}/events.parquet')").fetchone()[0]
    con.close()
    assert len(got) > observed  # dense grid has filled gap days
    assert got["last_type"].notna().all()


def test_order_percent_rank_matches_sql(sf_dir):
    got = Q.queries()["order_percent_rank"](sf_dir).to_pandas()
    want = duck_sql(sf_dir, Q.oracle_sql()["order_percent_rank"],
                    tables=("orders",))
    assert (want["pr"] > 0).any()  # multi-order customers exist
    _cmp(got, want)


def test_token_entropy_matches_sql_and_bruteforce(sf_dir):
    import collections
    import math

    import pyarrow.parquet as pq

    got = Q.queries()["token_entropy"](sf_dir).to_pandas()
    want = duck_sql(sf_dir, Q.oracle_sql()["token_entropy"],
                    tables=("documents",))
    _cmp(got, want)
    docs = pq.read_table(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas().head(50)
    g = got.set_index("doc_id")
    for _, row in docs.iterrows():
        toks = (row["text"] or "").split()
        if not toks:
            assert g.loc[row["doc_id"], "entropy"] == 0.0
            continue
        cnt = collections.Counter(toks)
        h = -sum(c / len(toks) * math.log(c / len(toks))
                 for c in cnt.values())
        assert abs(g.loc[row["doc_id"], "entropy"] - h) < 1e-5


def test_empty_block_schema_stability(tmp_path, sf_dir):
    """VERDICT r3 #5 (typed empty batches): ops run on a ONE-ROW input —
    which turns almost every hash partition / group / reduce block empty —
    must produce the SAME column names and dtypes as on real data, i.e. our
    batch fns return typed frames even when most of their blocks are empty.
    (A FULLY empty input is a different, Ray-level case: read_parquet of a
    zero-row file yields zero blocks, the UDF never runs and the dataset
    has no schema at all — covered by the rows-only empty-tables test
    above.  The benign 'RefBundle ... new schema: PandasBlockSchema(
    names=[])' warnings come from the AllToAll sort's own empty reduce
    partitions, emitted before any UDF runs — see bench.py's scoped log
    filter.)"""
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = str(tmp_path)
    ts = pd.Timestamp("2023-11-15")
    pq.write_table(pa.table({
        "doc_id": pa.array([1], pa.int64()),
        "text": pa.array(["the quick fox jumps"], pa.string()),
        "lang": pa.array(["en"], pa.string()),
        "source": pa.array(["s"], pa.string()),
        "n_chars": pa.array([19], pa.int64())}), f"{d}/documents.parquet")
    pq.write_table(pa.table({
        "event_id": pa.array([1], pa.int64()),
        "user_id": pa.array([7], pa.int64()),
        "ts": pa.array([ts], pa.timestamp("us")),
        "event_type": pa.array(["click"], pa.string()),
        "props": pa.array([""], pa.string())}), f"{d}/events.parquet")
    pq.write_table(pa.table({
        "o_orderkey": pa.array([1], pa.int64()),
        "o_custkey": pa.array([7], pa.int64()),
        "o_orderstatus": pa.array(["O"], pa.string()),
        "o_totalprice": pa.array([100.0], pa.float64()),
        "o_orderdate": pa.array([ts], pa.timestamp("us")),
        "o_orderpriority": pa.array(["1-URGENT"], pa.string())}),
        f"{d}/orders.parquet")

    from pdf_watermark_remover_ray.pipelines.relational import (
        events_window_distinct, user_activity_outer)
    from pdf_watermark_remover_ray.pipelines.text import (
        repetition_scores, text_stats)

    for fn in (repetition_scores, text_stats, user_activity_outer,
               events_window_distinct):
        tiny = fn(d).to_pandas()
        real = fn(sf_dir).to_pandas()
        assert len(tiny) >= 1 and len(real) > 0, fn.__name__
        assert list(tiny.columns) == list(real.columns), fn.__name__
        for c in real.columns:
            assert tiny[c].dtype == real[c].dtype, (fn.__name__, c)
