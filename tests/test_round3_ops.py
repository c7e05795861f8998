"""Round-3 operator additions vs DuckDB + planted cases: tfidf_top_terms,
order_priority_cube, q7_volume_shipping, forward as-of, label_centroids,
recursive process_folder."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from conftest import assert_frames_match, duck_sql

from pdf_watermark_remover_ray.pipelines import queries as Q


def test_tfidf_top_terms_matches_sql(sf_dir):
    from pdf_watermark_remover_ray.pipelines.text import tfidf_top_terms

    got = tfidf_top_terms(sf_dir).to_pandas()
    want = duck_sql(sf_dir, Q.oracle_sql()["tfidf_top_terms"],
                    tables=("documents",))
    assert_frames_match(got, want)
    # rank is dense 1..k per doc; scores are non-negative (df <= N)
    assert set(got["rank"].unique()) <= {1, 2, 3}
    assert (got["tfidf"] >= 0).all()
    assert (got.groupby("doc_id")["rank"].min() == 1).all()


def test_order_priority_cube_matches_sql(sf_dir):
    from pdf_watermark_remover_ray.pipelines.relational import (
        order_priority_cube, order_priority_rollup)

    got = order_priority_cube(sf_dir)
    want = duck_sql(sf_dir, Q.oracle_sql()["order_priority_cube"],
                    tables=("orders",))
    assert_frames_match(got, want)
    # the cube strictly extends the rollup by the by-priority marginal
    roll = order_priority_rollup(sf_dir)
    assert len(got) == len(roll) + got["o_orderpriority"].nunique() - 1


def test_q7_volume_shipping_matches_sql(sf_dir):
    from pdf_watermark_remover_ray.pipelines.relational import q7_volume_shipping

    got = q7_volume_shipping(sf_dir)
    want = duck_sql(sf_dir, Q.oracle_sql()["q7_volume_shipping"],
                    tables=("lineitem", "orders", "supplier", "customer",
                            "nation"))
    assert_frames_match(got, want)
    # both directions of the nation pair appear
    assert got["supp_nation"].nunique() == 2


def test_asof_forward_direction_planted():
    """Forward as-of picks the smallest right ts >= left ts; equal-ts ties
    go to the SMALLEST tie id (first-in-sort-order), lag stays >= 0."""
    import ray.data

    from pdf_watermark_remover_ray.stages.join import asof_join_tables

    left = pd.DataFrame({"k": np.int64([1, 1, 2]),
                         "ts_us": np.int64([100, 260, 100]),
                         "lid": np.int64([10, 11, 12])})
    right = pd.DataFrame({"k": np.int64([1, 1, 1, 2]),
                          "ts_us": np.int64([150, 150, 250, 90]),
                          "rid": np.int64([7, 9, 8, 3])})
    out = asof_join_tables(
        ray.data.from_pandas(left), ray.data.from_pandas(right),
        key="k", left_cols=["lid"], right_cols=["rid"], right_tie="rid",
        num_partitions=3, direction="forward").to_pandas().sort_values("lid")
    # lid=10 -> ts 150 tie to rid=7 (smallest); lid=11 -> nothing >= 260;
    # lid=12 -> nothing >= 100 for k=2
    assert out["lid"].tolist() == [10]
    assert out["rid"].tolist() == [7]
    assert out["lag_us"].tolist() == [50]

    import pytest

    with pytest.raises(ValueError):
        asof_join_tables(ray.data.from_pandas(left),
                         ray.data.from_pandas(right), key="k",
                         left_cols=["lid"], right_cols=["rid"],
                         right_tie="rid", direction="nearest")


def test_orders_events_asof_fwd_matches_sql(sf_dir):
    got = Q.queries()["orders_events_asof_fwd"](sf_dir).to_pandas()
    want = duck_sql(sf_dir, Q.oracle_sql()["orders_events_asof_fwd"],
                    tables=("orders", "events"))
    assert_frames_match(got, want)
    assert (got["lag_us"] >= 0).all()
    assert got["o_orderkey"].is_unique


def test_label_centroids_matches_sql_and_bruteforce(sf_dir):
    from pdf_watermark_remover_ray.pipelines.similarity import label_centroids

    got = label_centroids(sf_dir)
    want = duck_sql(sf_dir, Q.oracle_sql()["label_centroids"],
                    tables=("embeddings",))
    assert_frames_match(got, want)
    # brute-force check of one label against numpy
    emb = pq.read_table(f"{sf_dir}/embeddings.parquet").to_pandas()
    lab0 = emb[emb["label"] == emb["label"].iloc[0]]
    m = np.stack(lab0["embedding"].to_numpy()).astype(np.float64).mean(axis=0)
    g0 = got[got["label"] == emb["label"].iloc[0]].sort_values("dim")
    assert np.allclose(g0["c"].to_numpy(), np.round(m, 6), atol=1e-6)


def test_process_folder_recursive(tmp_path):
    from pdf_watermark_remover_ray.api import process_folder

    t = pa.table({"conv_id": pa.array(["c1"] * 2),
                  "turn_idx": pa.array([0, 1], pa.int32()),
                  "role": pa.array(["user", "assistant"]),
                  "text": pa.array(["hello WM_NAME", "world"]),
                  "tool": pa.array([None, None], pa.string()),
                  "ts": pa.array([pd.Timestamp("2024-01-01"),
                                  pd.Timestamp("2024-01-01 00:01")])})
    src = tmp_path / "in"
    (src / "sub").mkdir(parents=True)
    pq.write_table(t, src / "top.parquet")
    pq.write_table(t, src / "sub" / "nested.parquet")
    dst = tmp_path / "out"

    # default (reference semantics): non-recursive — nested file untouched
    ok, failed = process_folder(str(src), str(dst), "WM_NAME")
    assert ok and not failed
    assert (dst / "top.parquet").exists()
    assert not (dst / "sub" / "nested.parquet").exists()

    dst2 = tmp_path / "out2"
    ok, failed = process_folder(str(src), str(dst2), "WM_NAME",
                                recursive=True)
    assert ok and not failed
    assert (dst2 / "top.parquet").exists()
    assert (dst2 / "sub" / "nested.parquet").exists()
    out = pq.read_table(dst2 / "sub" / "nested.parquet").to_pandas()
    assert "WM_NAME" not in " ".join(out["text"].fillna(""))


def test_partitioned_sink_resume_and_pruning(sf_dir, tmp_path):
    """write_hive_partitioned commits per-partition _SUCCESS markers; a resumed
    run skips committed partitions and rewrites ONLY missing ones; read-back
    opens only requested (committed) directories."""
    import os

    import ray.data

    from pdf_watermark_remover_ray.sinks.batch import (
        committed_keys, read_hive_partitioned, write_hive_partitioned)

    out = str(tmp_path / "part_out")
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "lang"])
    first = write_hive_partitioned(ds, out, by="lang")
    assert set(first) == committed_keys(out, "lang") and len(first) >= 2

    # simulate a crashed partition: kill one marker (+ its data)
    victim = sorted(first)[0]
    os.remove(f"{out}/lang={victim}/_SUCCESS")
    os.remove(f"{out}/lang={victim}/part-00000.parquet")
    second = write_hive_partitioned(ds, out, by="lang")
    assert set(second) == {victim}  # ONLY the uncommitted partition rewrote

    # full resume: nothing pending
    assert write_hive_partitioned(ds, out, by="lang") == {}

    # pruned read returns exactly the requested partitions' rows
    got = read_hive_partitioned(out, "lang", values=[victim]).to_pandas()
    want = ds.to_pandas()
    want = want[want["lang"].fillna("") == victim]
    assert sorted(got["doc_id"]) == sorted(want["doc_id"])

    got = Q.queries()["partitioned_roundtrip"](sf_dir)
    want = duck_sql(sf_dir, Q.oracle_sql()["partitioned_roundtrip"],
                    tables=("documents",))
    assert_frames_match(got, want)


def test_unigram_surprisal_matches_sql_and_ordering(sf_dir):
    """Corpus-LM surprisal vs the SQL replay; a doc made of rare tokens
    scores above one made of the corpus's most common token."""
    from pdf_watermark_remover_ray.pipelines.text import unigram_surprisal

    got = unigram_surprisal(sf_dir).to_pandas()
    want = duck_sql(sf_dir, Q.oracle_sql()["unigram_surprisal"],
                    tables=("documents",))
    assert_frames_match(got, want)
    assert (got["surprisal"] > 0).all()


def test_audio_window_energy_bruteforce(sf_dir):
    """PCM windowed energy vs a plain-numpy reference on the same payloads
    (real binary decode — the non-SQL gate for audio_window_energy)."""
    from pdf_watermark_remover_ray.pipelines.multimodal import (
        audio_window_energy, payloads_from_documents)

    W = 64
    got = audio_window_energy(sf_dir, window=W).to_pandas() \
        .sort_values(["doc_id", "window_idx"]).reset_index(drop=True)
    pay = payloads_from_documents(sf_dir).to_pandas()
    rows = []
    for doc, b in zip(pay["doc_id"], pay["payload"]):
        x = np.frombuffer(b[:len(b) // 2 * 2], dtype="<i2").astype(np.float64)
        for i in range(0, len(x), W):
            seg = x[i:i + W]
            rows.append((doc, i // W, len(seg),
                         round(float(np.sqrt((seg ** 2).mean())), 6),
                         int(np.abs(seg).max())))
    want = pd.DataFrame(rows, columns=["doc_id", "window_idx", "n_samples",
                                       "rms", "peak"]) \
        .sort_values(["doc_id", "window_idx"]).reset_index(drop=True)
    assert len(got) == len(want)
    assert (got["doc_id"].to_numpy() == want["doc_id"].to_numpy()).all()
    assert (got["n_samples"].to_numpy() == want["n_samples"].to_numpy()).all()
    assert np.allclose(got["rms"], want["rms"], atol=1e-6)
    assert (got["peak"].to_numpy() == want["peak"].to_numpy()).all()


def test_orders_global_rank_matches_sql_and_bucket_invariance(sf_dir):
    """Total-order row numbers via range-bucket prefix counts equal the SQL
    ROW_NUMBER, and are invariant to the bucket count (the partitioning is
    an implementation detail, not a semantics knob)."""
    from pdf_watermark_remover_ray.pipelines.relational import orders_global_rank

    got = orders_global_rank(sf_dir).to_pandas()
    want = duck_sql(sf_dir, Q.oracle_sql()["orders_global_rank"],
                    tables=("orders",))
    assert_frames_match(got, want)
    few = orders_global_rank(sf_dir, num_buckets=3).to_pandas()
    a = got.sort_values("o_orderkey").reset_index(drop=True)
    b = few.sort_values("o_orderkey").reset_index(drop=True)
    assert (a["rn"].to_numpy() == b["rn"].to_numpy()).all()


def test_events_range_sum_matches_sql_and_peer_semantics(sf_dir):
    """Time-RANGE window sum vs SQL, plus planted equal-timestamp peers:
    every peer row must see the FULL same-timestamp frame (the divergence a
    naive pandas time-rolling would introduce)."""
    import ray.data

    from pdf_watermark_remover_ray.pipelines.relational import events_range_sum

    got = Q.queries()["events_range_sum"](sf_dir).to_pandas()
    want = duck_sql(sf_dir, Q.oracle_sql()["events_range_sum"],
                    tables=("events",))
    assert_frames_match(got, want)

    base = pd.Timestamp("2024-01-01").value // 1000
    df = pd.DataFrame({
        "event_id": np.int64([1, 2, 3, 4]),
        "user_id": np.int64([7, 7, 7, 7]),
        # two peers at t0, one inside the window, one outside
        "ts": pd.to_datetime([base, base, base + 500, base + 2_000],
                             unit="us"),
        "value": [1.0, 2.0, 4.0, 8.0],
    })
    t = tempfile_dir = None
    import pyarrow as pa_, tempfile, pyarrow.parquet as pq_
    d = tempfile.mkdtemp()
    pq_.write_table(pa_.Table.from_pandas(df, preserve_index=False),
                    f"{d}/events.parquet")
    out = events_range_sum(d, window_us=1_000, num_partitions=2) \
        .to_pandas().sort_values("event_id")
    # both peers at t0 see 1+2=3; t0+500 sees 1+2+4=7; t0+2000 sees only 8
    assert out["range_sum"].tolist() == [3.0, 3.0, 7.0, 8.0]


def test_tokenizer_encode_matches_sql_and_oov(sf_dir):
    """Vocab build + encode vs SQL; a tiny vocab forces OOV (-1) ids and the
    id sequence length always equals the doc's token count."""
    from pdf_watermark_remover_ray.pipelines.text import (tokenize_docs,
                                                          vocab_top_tokens)

    got = tokenize_docs(sf_dir).to_pandas()
    want = duck_sql(sf_dir, Q.oracle_sql()["tokenize_docs"],
                    tables=("documents",))
    assert_frames_match(got, want)
    for _, r in got.head(20).iterrows():
        assert len(r["ids"].split()) == r["n_tokens"]

    vgot = vocab_top_tokens(sf_dir)
    vwant = duck_sql(sf_dir, Q.oracle_sql()["vocab_top_tokens"],
                     tables=("documents",))
    assert_frames_match(vgot, vwant)
    # ids are dense 0..V-1 in (count desc, token asc) order
    assert vgot["token_id"].tolist() == list(range(len(vgot)))
    assert (vgot["n"].to_numpy()[:-1] >= vgot["n"].to_numpy()[1:]).all()

    tiny = tokenize_docs(sf_dir, vocab_size=3).to_pandas()
    assert tiny["ids"].str.contains("-1").any()  # OOV really maps to -1
    ids = np.concatenate([np.array(s.split(), dtype=np.int64)
                          for s in tiny["ids"]])
    assert ids.max() <= 2 and ids.min() == -1
