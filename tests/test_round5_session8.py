"""Round-5 session-8 additions: hybrid RRF retrieval fusion and the
streamed bounded-domain driver fold."""

from __future__ import annotations

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_hybrid_rrf_fuses_both_rankings():
    """RRF invariants on real tables: k rows per query, rank contiguous,
    rrf non-increasing within a query, every fused doc comes from one of
    the constituent pools, and any doc present in BOTH pools scores
    strictly higher than the best possible single-list doc at equal-or-
    worse ranks (1/(κ+r_s) + 1/(κ+r_d) > max single contribution)."""
    from pdf_watermark_remover_ray.pipelines.similarity import ann_topk
    from pdf_watermark_remover_ray.pipelines.text import (bm25_topk,
                                                          hybrid_topk_rrf)

    k, nq, pool, kappa = 10, 5, 20, 60.0
    out = hybrid_topk_rrf(SF, k=k, n_queries=nq, pool=pool, kappa=kappa)
    sparse = bm25_topk(SF, k=pool, n_queries=nq)
    dense = ann_topk(SF, n_queries=nq, k=pool)

    assert set(out.columns) == {"query_id", "rank", "doc_id", "rrf"}
    for qid, g in out.groupby("query_id"):
        assert list(g["rank"]) == list(range(1, len(g) + 1))
        assert len(g) <= k
        r = g["rrf"].to_numpy()
        assert (np.diff(r) <= 0).all(), qid

    pool_docs = set(sparse["doc_id"]) | set(dense["vec_id"])
    assert set(out["doc_id"]) <= pool_docs

    # a doc on both lists beats any doc on exactly one list whose single
    # rank is no better than either of its ranks
    both = pd.merge(sparse[["query_id", "doc_id", "rank"]],
                    dense.assign(
                        rank=dense.groupby("query_id").cumcount() + 1)
                    .rename(columns={"vec_id": "doc_id"})
                    [["doc_id", "rank"]],
                    on="doc_id", suffixes=("_s", "_d"))
    if len(both):
        row = both.iloc[0]
        fused = 1 / (kappa + row["rank_s"]) + 1 / (kappa + row["rank_d"])
        assert fused > 1 / (kappa + min(row["rank_s"], row["rank_d"]))


def test_dsir_weights_separate_target_from_rest():
    """Importance weights must actually discriminate: target-language docs
    score higher on average than the rest (the log-ratio features exist to
    up-weight target-like text), and every doc gets exactly one weight."""
    import duckdb

    from pdf_watermark_remover_ray.pipelines.text import dsir_weights

    out = dsir_weights(SF, target_lang="en")
    docs = duckdb.sql(
        f"SELECT doc_id, lang FROM read_parquet('{SF}/documents.parquet')"
    ).df()
    assert len(out) == len(docs)
    assert out["doc_id"].is_unique
    m = out.merge(docs, on="doc_id")
    en = m.loc[m["lang"] == "en", "weight"].mean()
    rest = m.loc[m["lang"] != "en", "weight"].mean()
    assert en > rest, (en, rest)


def test_merge_bounded_partials_streams_and_recollapses():
    """The streamed fold must produce the same totals as a one-shot pandas
    groupby even when the 64k re-collapse threshold fires mid-stream."""
    import ray.data

    from pdf_watermark_remover_ray.pipelines.relational import \
        _merge_bounded_partials

    rng = np.random.default_rng(31)
    n = 200_000  # > the 64k pending threshold across blocks
    df = pd.DataFrame({"k": rng.integers(0, 7, n),
                       "v": rng.integers(0, 100, n).astype(np.int64)})
    ds = ray.data.from_pandas(df).repartition(13)
    out = _merge_bounded_partials(ds, keys=["k"], sums={"v": "total"})
    want = df.groupby("k", as_index=False)["v"].sum() \
        .rename(columns={"v": "total"})
    got = out.sort_values("k").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got, want.sort_values("k").reset_index(drop=True),
        check_dtype=False)


def test_ngram_diversity_orders_repetitive_below_diverse(tmp_path):
    """A source whose docs repeat one template must score strictly lower
    distinct-n diversity than a source of unique texts, and the ratio
    equals brute force on a planted corpus."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pdf_watermark_remover_ray.pipelines.text import ngram_diversity

    rep = ["the same template line again"] * 30
    div = [f"unique words number {i} appear here once {i * 7}"
           for i in range(30)]
    docs = pa.table({
        "doc_id": pa.array(range(60), pa.int64()),
        "text": pa.array(rep + div, pa.string()),
        "lang": pa.array(["en"] * 60, pa.string()),
        "source": pa.array(["rep"] * 30 + ["div"] * 30, pa.string()),
        "n_chars": pa.array([len(t) for t in rep + div], pa.int64()),
    })
    pq.write_table(docs, tmp_path / "documents.parquet")
    out = ngram_diversity(str(tmp_path), n=3).set_index("source")

    def brute(texts):
        grams = [" ".join(t.split()[i:i + 3])
                 for t in texts for i in range(len(t.split()) - 2)]
        return len(set(grams)), len(grams)

    for src, texts in (("rep", rep), ("div", div)):
        d, t = brute(texts)
        assert out.loc[src, "distinct_ngrams"] == d
        assert out.loc[src, "total_ngrams"] == t
    assert out.loc["rep", "diversity"] < out.loc["div", "diversity"]


def test_broadcast_fallbacks_match_q14_q17_q19():
    """The q14/q17/q19 over-threshold paths (shuffle-attach / tag-union)
    must equal their broadcast paths bit-for-bit on the same input (the
    q3-style cross-threshold contract, extended to the last unguarded
    part-table broadcasts)."""
    from pdf_watermark_remover_ray.pipelines.relational import (
        q14_promo_revenue, q17_small_quantity_revenue,
        q19_disjunctive_revenue)

    for fn in (q14_promo_revenue, q17_small_quantity_revenue,
               q19_disjunctive_revenue):
        a = fn(SF)
        b = fn(SF, broadcast_threshold=0)
        pd.testing.assert_frame_equal(a, b), fn.__name__


def test_merge_bounded_partials_empty_returns_none():
    import ray.data

    from pdf_watermark_remover_ray.pipelines.relational import \
        _merge_bounded_partials

    ds = ray.data.from_pandas(pd.DataFrame({"k": pd.Series([], dtype=int),
                                            "v": pd.Series([], dtype=int)}))
    assert _merge_bounded_partials(ds, keys=["k"], sums={"v": "n"}) is None
