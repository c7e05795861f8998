"""Quality filter / bag dedup / JSON extraction vs DuckDB + planted cases."""

from __future__ import annotations

import numpy as np
import pandas as pd

from pdf_watermark_remover_ray.pipelines import queries as Q
from pdf_watermark_remover_ray.pipelines import text as T


from conftest import assert_frames_match as _cmp
from conftest import duck_sql


def _duck(sf_dir: str, sql: str) -> pd.DataFrame:
    return duck_sql(sf_dir, sql, tables=("documents", "events"))


def test_quality_filter_matches_sql(sf_dir):
    got = T.quality_filter(sf_dir).to_pandas()
    want = _duck(sf_dir, Q.oracle_sql()["quality_filter"])
    # every rule except mean-word-length must actually fire on this corpus
    assert got["keep"].any() and not got["keep"].all()
    assert (~got["has_stopword"]).any()
    assert (got["distinct_ratio"] < T.QUALITY_MIN_DISTINCT_RATIO).any()
    _cmp(got, want)


def test_bag_dedup_matches_sql_and_reorder_planted(sf_dir, tmp_path):
    got = T.bag_dedup(sf_dir).to_pandas()
    want = _duck(sf_dir, Q.oracle_sql()["bag_dedup"])
    _cmp(got, want)

    # planted: same bag in a different order collapses; different bag doesn't
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": ["alpha beta gamma", "gamma alpha beta",  # reordered dup
                 "alpha beta beta",                        # different multiset
                 "alpha beta gamma"],                      # exact dup
    })
    pq.write_table(t, tmp_path / "documents.parquet")
    out = T.bag_dedup(str(tmp_path), num_partitions=2).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert out["doc_id"].tolist() == [1, 3]
    assert out.set_index("doc_id")["n_copies"].to_dict() == {1: 3, 3: 1}


def test_json_extract_matches_sql(sf_dir):
    got = T.json_extract_events(sf_dir).to_pandas()
    want = _duck(sf_dir, Q.oracle_sql()["json_extract_events"])
    got["k"] = got["k"].astype("int64")
    want["k"] = want["k"].astype("int64")
    _cmp(got, want)


def test_top_bigrams_bruteforce(sf_dir):
    import pyarrow.parquet as pq

    got = T.top_bigrams(sf_dir, k=10)
    texts = pq.read_table(f"{sf_dir}/documents.parquet",
                          columns=["text"])["text"].to_pylist()
    grams = []
    for t in texts:
        toks = (t or "").split()
        grams.extend(toks[i] + " " + toks[i + 1] for i in range(len(toks) - 1))
    vc = pd.Series(grams).value_counts()
    want = vc.reset_index()
    want.columns = ["bigram", "n"]
    want = want.sort_values(["n", "bigram"], ascending=[False, True],
                            kind="mergesort").head(10).reset_index(drop=True)
    assert got["bigram"].tolist() == want["bigram"].tolist()
    assert got["n"].astype(int).tolist() == want["n"].astype(int).tolist()


def test_contamination_flags_hits(sf_dir):
    got = T.contamination_flags(sf_dir).to_pandas()
    assert got["contaminated"].any() and not got["contaminated"].all()
    assert (got.loc[got["contaminated"], "n_hits"] > 0).all()
    assert (got.loc[~got["contaminated"], "n_hits"] == 0).all()


def test_source_mix_weights_matches_sql(sf_dir):
    got = T.source_mix_weights(sf_dir)
    want = _duck(sf_dir, Q.oracle_sql()["source_mix_weights"])
    _cmp(got, want)
    # weights flatten the mixture: sum(share) == 1, weight*share == 1/G
    assert abs(got["token_share"].sum() - 1.0) < 1e-4
    prod = got["mix_weight"] * got["token_share"]
    assert np.allclose(prod, 1.0 / len(got), atol=1e-4)


def test_doc_length_buckets_matches_sql(sf_dir):
    got = T.doc_length_buckets(sf_dir).to_pandas()
    want = _duck(sf_dir, Q.oracle_sql()["doc_length_buckets"])
    _cmp(got, want)
    # every lang uses all four buckets on a 100-doc-per-lang-ish table and
    # quartile sizes are balanced within rounding
    for _, g in got.groupby("lang"):
        counts = g["bucket"].value_counts()
        assert set(counts.index) <= {1, 2, 3, 4}
        assert counts.max() - counts.min() <= max(4, len(g) // 2)


def test_decontaminate_split_planted(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pdf_watermark_remover_ray.functions.sampling import (
        _hash_bucket, decontaminate_split)

    # deterministically pick ids per split bucket from the same hash the
    # operator uses
    ids = pd.Series(range(1000))
    b = _hash_bucket(ids)
    train_ids = ids[b < 90].tolist()
    test_ids = ids[b >= 95].tolist()
    assert len(train_ids) >= 3 and len(test_ids) >= 2
    t = pa.table({
        "doc_id": pa.array([train_ids[0], train_ids[1], train_ids[2],
                            test_ids[0], test_ids[1]], pa.int64()),
        "text": ["leaked text", "clean text", "also leaked",
                 "leaked text", "also leaked"],
    })
    pq.write_table(t, tmp_path / "documents.parquet")
    out = decontaminate_split(str(tmp_path), num_partitions=4).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    flags = out.set_index("doc_id")["contaminated"].to_dict()
    assert flags == {train_ids[0]: True, train_ids[1]: False,
                     train_ids[2]: True}


def test_mix_rebalanced_matches_sql_and_flattens(sf_dir):
    from pdf_watermark_remover_ray.functions.sampling import (
        mix_rebalanced_documents, mix_rebalanced_oracle_sql)

    got = mix_rebalanced_documents(sf_dir).to_pandas()
    want = _duck(sf_dir, mix_rebalanced_oracle_sql())
    _cmp(got, want)
    # rebalancing narrows the doc-count spread across (lang, source) blocks
    before = _duck(sf_dir, "SELECT lang, source, count(*) n FROM documents "
                           "GROUP BY lang, source")["n"]
    after = got.groupby(["lang", "source"]).size()
    assert len(got) < len(_duck(sf_dir, "SELECT doc_id FROM documents"))
    assert (after.max() / max(after.min(), 1)) <= \
        (before.max() / max(before.min(), 1)) + 1e-9


def test_null_key_and_messy_json_regression(tmp_path):
    """Data-dependent edges the sf fixtures never hit: null lang/source
    blocks and non-integer / malformed JSON payloads must keep every engine
    operator in lockstep with its oracle (drop-vs-crash and coerce-vs-null
    divergences found by review)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pdf_watermark_remover_ray.functions.sampling import (
        mix_rebalanced_documents, mix_rebalanced_oracle_sql)

    rng = np.random.default_rng(7)
    n = 60
    langs = np.array(["en", "fr", None], dtype=object)[rng.integers(0, 3, n)]
    sources = np.array(["web", None], dtype=object)[rng.integers(0, 2, n)]
    texts = [" ".join(f"w{rng.integers(0, 9)}" for _ in range(3 + i % 5))
             for i in range(n)]
    # planted zero-token block: every doc in (zz, pad) is empty/whitespace —
    # its mix share is 0 and mix_weight must come out NULL/NaN on BOTH sides
    # (engine inf vs oracle NULL was a live divergence), and the whole block
    # must drop from the rebalanced output
    langs = np.concatenate([langs, np.array(["zz"] * 4, dtype=object)])
    sources = np.concatenate([sources, np.array(["pad"] * 4, dtype=object)])
    texts = texts + ["", "   ", "", "\t"]
    n += 4
    t = pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "lang": pa.array(langs, pa.string()),
        "source": pa.array(sources, pa.string()),
        "text": pa.array(texts, pa.string()),
        "n_chars": pa.array([len(s) for s in texts], pa.int64()),
    })
    pq.write_table(t, tmp_path / "documents.parquet")
    ev = pa.table({
        "event_id": pa.array(np.arange(8, dtype=np.int64)),
        "props": pa.array(['{"k": 3}', '{"k": 1.5}', '{"k": "5"}',
                           '{"k": true}', 'not json', None,
                           '{"x": 2}', '{"k": null}'], pa.string()),
    })
    pq.write_table(ev, tmp_path / "events.parquet")
    d = str(tmp_path)

    got = T.source_mix_weights(d)
    want = _duck(d, Q.oracle_sql()["source_mix_weights"])
    assert (got["lang"] == "").any() or (got["source"] == "").any()
    zz = got[(got["lang"] == "zz") & (got["source"] == "pad")]
    assert len(zz) == 1 and zz["mix_weight"].isna().all()
    _cmp(got, want)

    got = mix_rebalanced_documents(d).to_pandas()
    # zero-token block: keep-rate defined as 1.0 on both sides — all 4 stay
    assert ((got["lang"] == "zz") & (got["source"] == "pad")).sum() == 4
    _cmp(got, _duck(d, mix_rebalanced_oracle_sql()))

    got = T.doc_length_buckets(d).to_pandas()
    want = _duck(d, Q.oracle_sql()["doc_length_buckets"])
    assert len(want) < n  # null-lang rows drop (JOIN semantics), not crash
    _cmp(got, want)

    got = T.json_extract_events(d).to_pandas()
    want = _duck(d, Q.oracle_sql()["json_extract_events"])
    got["k"] = got["k"].astype("float64")
    want["k"] = want["k"].astype("float64")
    assert got["k"].notna().sum() == 1  # only the true JSON int survives
    _cmp(got, want)


def test_conversation_docs_matches_sql(sf_dir):
    got = Q.queries()["conversation_docs"](sf_dir).to_pandas()
    want = duck_sql(sf_dir, Q.oracle_sql()["conversation_docs"],
                    tables=("events",))
    _cmp(got, want)
    # doc structure: one line per turn, each starting with its role
    for _, r in got.iterrows():
        lines = r["doc"].split("\n")
        assert len(lines) == r["n_turns"]
        assert len(r["doc"]) == r["n_chars"]
        assert all(l.split(":")[0] in ("user", "assistant", "tool")
                   for l in lines)


def test_pack_sequences_matches_sql_and_invariants(sf_dir):
    got = Q.queries()["pack_sequences"](sf_dir).to_pandas()
    want = duck_sql(sf_dir, Q.oracle_sql()["pack_sequences"],
                    tables=("documents",))
    _cmp(got, want)
    g = got.sort_values("doc_id").reset_index(drop=True)
    # packs are contiguous and non-decreasing in doc_id order, starting at 0
    pid = g["pack_id"].to_numpy()
    assert pid[0] == 0
    assert (np.diff(pid) >= 0).all()
    # a doc belongs to the pack where it STARTS: its exclusive prefix sum
    # floor-divided by the budget
    cb = np.cumsum(g["ws_tokens"].to_numpy()) - g["ws_tokens"].to_numpy()
    assert (pid == cb // T.PACK_BUDGET_TOKENS).all()


def test_pack_sequences_partition_invariant(sf_dir):
    """The distributed prefix sum must not depend on the bucket count."""
    a = T.pack_sequences(sf_dir, num_partitions=3).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    b = T.pack_sequences(sf_dir, num_partitions=16).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)


def test_shuffle_documents_matches_sql_and_is_permutation(sf_dir):
    from pdf_watermark_remover_ray.functions import sampling as S

    got = Q.queries()["shuffle_documents"](sf_dir).to_pandas()
    want = duck_sql(sf_dir, Q.oracle_sql()["shuffle_documents"],
                    tables=("documents",))
    _cmp(got, want)
    # a permutation: positions are exactly 0..n-1, doc_ids unique
    assert sorted(got["pos"].tolist()) == list(range(len(got)))
    assert got["doc_id"].is_unique
    # bucket-count invariance: the distributed enumeration must not depend
    # on how many hash-range buckets carved the prefix counts
    b4 = S.shuffle_documents(sf_dir, num_buckets=4).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    b16 = got.sort_values("doc_id").reset_index(drop=True)
    assert b4.equals(b16)
    # a different seed yields a different permutation
    other = S.shuffle_documents(sf_dir, seed=7).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert not other["pos"].equals(b16["pos"])


def test_pack_and_shuffle_empty_input(tmp_path):
    """Empty-stream pass-through (P4) for the prefix-sum family."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pdf_watermark_remover_ray.functions import sampling as S

    pq.write_table(pa.table({"doc_id": pa.array([], pa.int64()),
                             "text": pa.array([], pa.string())}),
                   tmp_path / "documents.parquet")
    # all-empty Datasets drop their schema on to_pandas (same Ray behavior
    # q_late documents) — the contract here is "0 rows, no crash"
    p = T.pack_sequences(str(tmp_path)).to_pandas()
    assert len(p) == 0
    s = S.shuffle_documents(str(tmp_path)).to_pandas()
    assert len(s) == 0


def test_ngram_decontaminate_planted_partial_leakage(tmp_path):
    """The n-gram check catches PARTIAL leakage that the exact-text check
    misses: a train doc quoting >= n consecutive words of a test doc is
    flagged; sharing only shorter runs is not; < n-token docs are clean by
    definition; and the flag set is partition-count invariant."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pdf_watermark_remover_ray.functions.sampling import (
        _hash_bucket, decontaminate_split, ngram_decontaminate)

    ids = pd.Series(range(1000))
    b = _hash_bucket(ids)
    train_ids = ids[b < 90].tolist()
    test_ids = ids[b >= 95].tolist()
    secret = "alpha bravo charlie delta echo"  # a 5-gram in the test doc
    t = pa.table({
        "doc_id": pa.array([train_ids[0], train_ids[1], train_ids[2],
                            train_ids[3], test_ids[0]], pa.int64()),
        "text": [
            f"intro words then {secret} and a different tail",  # partial quote
            "totally unrelated text with many more words here",
            "alpha bravo charlie unrelated delta echo",  # only a 3-word run
            "tiny doc",                                   # < n tokens
            f"the test document says {secret} verbatim",
        ],
    })
    pq.write_table(t, tmp_path / "documents.parquet")
    flags = ngram_decontaminate(str(tmp_path), n=5, num_partitions=4) \
        .to_pandas().set_index("doc_id")["contaminated"].to_dict()
    assert flags == {train_ids[0]: True, train_ids[1]: False,
                     train_ids[2]: False, train_ids[3]: False}
    # exact-text decontamination misses the partial quote
    exact = decontaminate_split(str(tmp_path), num_partitions=4) \
        .to_pandas().set_index("doc_id")["contaminated"].to_dict()
    assert exact[train_ids[0]] is False or exact[train_ids[0]] == False  # noqa: E712
    # partition invariance
    flags17 = ngram_decontaminate(str(tmp_path), n=5, num_partitions=17) \
        .to_pandas().set_index("doc_id")["contaminated"].to_dict()
    assert flags17 == flags


def test_chunk_documents_planted(tmp_path):
    """Chunk boundaries, trailing partial, empty doc, and reassembly: the
    concatenation of a doc's chunks equals its normalized token stream."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pdf_watermark_remover_ray.pipelines.text import chunk_documents

    t = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": ["a b c d e f g", "  x   y  ", ""],
    })
    pq.write_table(t, tmp_path / "documents.parquet")
    out = chunk_documents(str(tmp_path), chunk_tokens=3).to_pandas() \
        .sort_values(["doc_id", "chunk_idx"]).reset_index(drop=True)
    assert list(out["doc_id"]) == [1, 1, 1, 2]
    assert list(out["text"]) == ["a b c", "d e f", "g", "x y"]
    assert list(out["n_tokens"]) == [3, 3, 1, 2]
    joined = " ".join(out[out["doc_id"] == 1]["text"])
    assert joined == "a b c d e f g"
    import pytest

    with pytest.raises(ValueError):
        chunk_documents(str(tmp_path), chunk_tokens=0)
