"""Round-4 session-4 operators: iterative PageRank over the bipartite
customer-supplier trade graph (the engine's join-free BSP iteration shape)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from pdf_watermark_remover_ray.pipelines import queries as Q

from conftest import assert_frames_match as _cmp
from conftest import duck_sql


@pytest.fixture(scope="module")
def pagerank_result(sf_dir):
    got = Q.queries()["customer_supplier_pagerank"](sf_dir)
    return got.to_pandas() if hasattr(got, "to_pandas") else got


def test_pagerank_matches_sql(sf_dir, pagerank_result):
    want = duck_sql(sf_dir, Q.oracle_sql()["customer_supplier_pagerank"],
                    tables=("lineitem", "orders"))
    assert len(want) > 0
    _cmp(pagerank_result, want)


def test_pagerank_mass_conservation(sf_dir, pagerank_result):
    """A symmetrized graph has no dangling nodes, so total rank mass is
    exactly 1 after any number of damped iterations (up to rounding)."""
    out = pagerank_result
    assert out["node"].is_unique
    assert abs(out["rank"].sum() - 1.0) < 1e-6
    assert (out["rank"] > 0).all()
    # bipartite namespacing survived the int64 round-trip
    assert set(out["node"].str[:2].unique()) == {"c:", "s:"}


@pytest.mark.parametrize("name,tables", [
    ("lineitem_regression_stats", ("lineitem",)),
    ("user_mode_event", ("events",)),
    ("weighted_sample_documents", ("documents",)),
])
def test_session4_matches_sql(sf_dir, name, tables):
    got = Q.queries()[name](sf_dir)
    got = got.to_pandas() if hasattr(got, "to_pandas") else got
    want = duck_sql(sf_dir, Q.oracle_sql()[name], tables=tables)
    assert len(want) > 0, name
    _cmp(got, want)


def test_regression_stats_bounds(sf_dir):
    out = Q.queries()["lineitem_regression_stats"](sf_dir)
    out = out.to_pandas() if hasattr(out, "to_pandas") else out
    assert (out["corr_qty_price"].abs() <= 1.0).all()
    # slope and covariance agree in sign (slope = covar / var_x, var_x > 0)
    assert (np.sign(out["slope"]) == np.sign(out["covar_qty_price"])).all()


def test_weighted_sample_is_exact_topk(sf_dir):
    """The distributed partial-top-k must equal the single-pass A-ES top-k
    computed directly (catches a too-small per-batch candidate cut)."""
    import pyarrow.parquet as pq

    from pdf_watermark_remover_ray.functions.hashing import md5_u64

    out = Q.queries()["weighted_sample_documents"](sf_dir)
    out = out.to_pandas() if hasattr(out, "to_pandas") else out
    t = pq.read_table(f"{sf_dir}/documents.parquet",
                      columns=["doc_id", "n_chars"]).to_pandas()
    ids = t["doc_id"].to_numpy(np.int64)
    w = np.maximum(t["n_chars"].to_numpy(np.float64), 1.0)
    u = md5_u64(ids.astype(str)).astype(np.float64) / 2.0 ** 64
    key = u ** (1.0 / w)
    order = np.lexsort((ids, -key))[:100]
    assert set(out["doc_id"]) == set(ids[order])


def test_user_mode_event_unique_users(sf_dir):
    out = Q.queries()["user_mode_event"](sf_dir)
    out = out.to_pandas() if hasattr(out, "to_pandas") else out
    assert out["user_id"].is_unique
    assert (out["n"] >= 1).all()


def test_token_cooccurrence_matches_sql(sf_dir):
    got = Q.queries()["token_cooccurrence"](sf_dir)
    got = got.to_pandas() if hasattr(got, "to_pandas") else got
    want = duck_sql(sf_dir, Q.oracle_sql()["token_cooccurrence"],
                    tables=("documents",))
    assert len(want) > 0
    _cmp(got, want)


def test_token_cooccurrence_pairs_canonical(sf_dir):
    """Pairs are unordered (canonicalized lo <= hi) and counts positive."""
    out = Q.queries()["token_cooccurrence"](sf_dir)
    out = out.to_pandas() if hasattr(out, "to_pandas") else out
    lo = out["pair"].str.split(" ").str[0]
    hi = out["pair"].str.split(" ").str[-1]
    assert (lo <= hi).all()
    assert (out["n"] > 0).all()
    assert out["n"].is_monotonic_decreasing


def test_kmeans_embeddings_matches_sql(sf_dir):
    got = Q.queries()["kmeans_embeddings"](sf_dir)
    got = got.to_pandas() if hasattr(got, "to_pandas") else got
    want = duck_sql(sf_dir, Q.oracle_sql()["kmeans_embeddings"],
                    tables=("embeddings",))
    assert len(want) > 0
    _cmp(got, want)
    # non-degenerate: more than one cluster actually used
    assert got["cluster"].nunique() > 1


def test_event_value_mad_matches_sql(sf_dir):
    got = Q.queries()["event_value_mad"](sf_dir)
    got = got.to_pandas() if hasattr(got, "to_pandas") else got
    want = duck_sql(sf_dir, Q.oracle_sql()["event_value_mad"],
                    tables=("events",))
    assert len(want) > 0
    _cmp(got, want)
    assert (got["mad_value"] >= 0).all()


def test_edit_dup_pairs_matches_sql(sf_dir):
    got = Q.queries()["edit_dup_pairs"](sf_dir)
    got = got.to_pandas() if hasattr(got, "to_pandas") else got
    want = duck_sql(sf_dir, Q.oracle_sql()["edit_dup_pairs"],
                    tables=("documents",))
    assert len(want) > 0
    _cmp(got, want)


def test_levenshtein_kernel():
    from pdf_watermark_remover_ray.pipelines.dedup import _levenshtein

    assert _levenshtein("", "") == 0
    assert _levenshtein("abc", "") == 3
    assert _levenshtein("kitten", "sitting") == 3
    assert _levenshtein("flaw", "lawn") == 2
    assert _levenshtein("abc", "abc") == 0
    # agreement with a reference O(n*m) scalar DP on random strings
    import random

    rng = random.Random(7)

    def ref(a, b):
        la, lb = len(a), len(b)
        prev = list(range(lb + 1))
        for i in range(1, la + 1):
            cur = [i] + [0] * lb
            for j in range(1, lb + 1):
                cur[j] = min(prev[j] + 1, cur[j - 1] + 1,
                             prev[j - 1] + (a[i - 1] != b[j - 1]))
            prev = cur
        return prev[-1]

    for _ in range(25):
        a = "".join(rng.choice("abcde") for _ in range(rng.randint(0, 30)))
        b = "".join(rng.choice("abcde") for _ in range(rng.randint(0, 30)))
        assert _levenshtein(a, b) == ref(a, b), (a, b)


def test_pagerank_pinned_equals_dataset_variant(sf_dir, pagerank_result):
    """The Pregel-style pinned-actor variant must emit exactly the Dataset
    variant's rows (same graph, same math, same rounding)."""
    b = Q.queries()["customer_supplier_pagerank_pinned"](sf_dir)
    b = b.to_pandas() if hasattr(b, "to_pandas") else b
    pd.testing.assert_frame_equal(pagerank_result.reset_index(drop=True),
                                  b.reset_index(drop=True))


def test_bpe_pair_counts_matches_sql(sf_dir):
    got = Q.queries()["bpe_pair_counts"](sf_dir)
    got = got.to_pandas() if hasattr(got, "to_pandas") else got
    want = duck_sql(sf_dir, Q.oracle_sql()["bpe_pair_counts"],
                    tables=("documents",))
    assert len(want) > 0
    _cmp(got, want)
    assert (got["pair"].str.len() == 2).all()


def test_events_zorder_matches_sql(sf_dir):
    from pdf_watermark_remover_ray.pipelines.relational import (
        events_zorder_pruned)

    got = Q.queries()["events_zorder_pruned"](sf_dir)
    got = got.to_pandas() if hasattr(got, "to_pandas") else got
    want = duck_sql(sf_dir, Q.oracle_sql()["events_zorder_pruned"],
                    tables=("events",))
    assert len(want) > 0
    _cmp(got, want)
    # the layout must actually PRUNE: the 2-D rectangle opens a strict
    # subset of the z-bucket files (z-ordering makes BOTH columns' per-file
    # min/max tight; a 1-column sort could only prune on that column)
    opened, total = events_zorder_pruned.last_prune
    assert total >= 8
    assert opened < total, (opened, total)


def test_dedup_keep_best_matches_sql(sf_dir):
    got = Q.queries()["dedup_keep_best"](sf_dir)
    got = got.to_pandas() if hasattr(got, "to_pandas") else got
    want = duck_sql(sf_dir, Q.oracle_sql()["dedup_keep_best"],
                    tables=("documents",))
    assert len(want) > 0
    _cmp(got, want)
    # the keep rule must sometimes differ from min-doc_id (else vacuous)
    clusters = Q.queries()["dedup_clusters"](sf_dir)
    clusters = clusters.to_pandas() if hasattr(clusters, "to_pandas") \
        else clusters
    assert (got["kept_doc_id"] != got["rep_id"]).any() or \
        len(got) == clusters["rep_id"].nunique()


def test_jsonl_roundtrip_matches_sql(sf_dir):
    got = Q.queries()["jsonl_roundtrip"](sf_dir)
    got = got.to_pandas() if hasattr(got, "to_pandas") else got
    want = duck_sql(sf_dir, Q.oracle_sql()["jsonl_roundtrip"],
                    tables=("documents",))
    assert len(want) > 0
    _cmp(got, want)


def test_zipf_slope_matches_sql(sf_dir):
    got = Q.queries()["zipf_slope"](sf_dir)
    got = got.to_pandas() if hasattr(got, "to_pandas") else got
    want = duck_sql(sf_dir, Q.oracle_sql()["zipf_slope"],
                    tables=("documents",))
    _cmp(got, want)
    assert got["slope"].iloc[0] < 0  # frequency falls with rank


def test_csv_roundtrip_matches_sql(sf_dir):
    got = Q.queries()["csv_roundtrip"](sf_dir)
    got = got.to_pandas() if hasattr(got, "to_pandas") else got
    want = duck_sql(sf_dir, Q.oracle_sql()["csv_roundtrip"],
                    tables=("events",))
    assert len(want) > 0
    _cmp(got, want)


def test_prepared_corpus_matches_sql(sf_dir):
    got = Q.queries()["prepared_corpus"](sf_dir)
    got = got.to_pandas() if hasattr(got, "to_pandas") else got
    want = duck_sql(sf_dir, Q.oracle_sql()["prepared_corpus"],
                    tables=("documents",))
    assert len(want) > 0
    _cmp(got, want)
    # the composition must actually subtract something vs plain curate
    cur = Q.queries()["curate_corpus"](sf_dir)
    cur = cur.to_pandas() if hasattr(cur, "to_pandas") else cur
    assert len(got) <= len(cur)


def test_pagerank_pinned_partition_invariance(sf_dir, pagerank_result):
    """Output is invariant under the actor-partition count (SURVEY §5.3
    discipline applied to the Pregel path): message routing and local
    combines must not leak P into the math."""
    from pdf_watermark_remover_ray.pipelines.relational import (
        customer_supplier_pagerank_pinned)

    b = customer_supplier_pagerank_pinned(sf_dir, num_partitions=3)
    pd.testing.assert_frame_equal(pagerank_result.reset_index(drop=True),
                                  b.reset_index(drop=True))


NO_ORACLE_WHITELIST = {
    # non-SQL-expressible, each golden-tested instead (VERDICT r3 table).
    # The IVF/PQ quartet left this list in round 5 (k-means training is a
    # 9-dp fixed-point computation the oracle replays end-to-end —
    # queries._ivf_sql / _pq_sql), as did audio_window_energy (hex(blob) +
    # substr recovers each int16 PCM sample in SQL).  What remains is span
    # surgery (scrub_full) and the epoch/kill-resume driver (streaming_e2e)
    # — genuinely stateful, golden-tested.
    "scrub_full", "streaming_e2e",
}


def test_registry_oracle_parity():
    """Every queries() entry is either DuckDB-oracle-gated or on the
    documented no-oracle whitelist — new operators cannot land without a
    correctness gate (drift guard for the driver's CORRECTNESS run)."""
    qs, oracles = set(Q.queries()), set(Q.oracle_sql())
    assert oracles <= qs, oracles - qs  # no orphan oracles
    missing = qs - oracles - NO_ORACLE_WHITELIST
    assert not missing, f"queries without oracle or whitelist: {missing}"
    stale = NO_ORACLE_WHITELIST - qs
    assert not stale, f"whitelist entries not in registry: {stale}"
