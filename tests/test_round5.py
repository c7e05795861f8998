"""Round-5 session 1: broadcast-size guards with shuffle fallbacks for
q5/q7/q8 (VERDICT r4 item 2), ADVICE fixes (enrich stream gating, reshard
layout guard, bm25 tmpdir lifecycle, empty-input guards)."""

from __future__ import annotations

import glob
import os
import tempfile

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pdf_watermark_remover_ray.pipelines import queries as Q

from conftest import assert_frames_match as _cmp
from conftest import duck_sql

ALL_TABLES = ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem")


@pytest.mark.parametrize("name,fn_kwargs", [
    ("q5_revenue_by_nation", {}),
    ("q7_volume_shipping", {}),
    ("q8_market_share", {}),
])
def test_broadcast_guard_fallback_matches_broadcast(sf_dir, name, fn_kwargs):
    """Both sides of the broadcast-size guard produce identical oracle
    results: threshold 0 forces the tag-union shuffle fallback
    (_shuffle_semijoin / _shuffle_attach), the default threshold takes the
    ray.put broadcast path (same pattern as
    test_q3_join_fallback_matches_broadcast)."""
    from pdf_watermark_remover_ray.pipelines import relational as R

    fn = {"q5_revenue_by_nation": R.q5_revenue_by_nation,
          "q7_volume_shipping": R.q7_volume_shipping,
          "q8_market_share": R.q8_market_share}[name]
    want = duck_sql(sf_dir, Q.oracle_sql()[name], tables=ALL_TABLES)
    assert len(want) > 0
    got_shuffle = fn(sf_dir, broadcast_threshold=0, **fn_kwargs)
    _cmp(got_shuffle, want)
    got_bcast = fn(sf_dir, **fn_kwargs)
    _cmp(got_bcast, want)


def _write_empty(d: str) -> None:
    pq.write_table(pa.table({
        "vec_id": pa.array([], pa.int64()),
        "embedding": pa.array([], pa.list_(pa.float32())),
        "label": pa.array([], pa.int32())}), f"{d}/embeddings.parquet")
    pq.write_table(pa.table({
        "doc_id": pa.array([], pa.int64()), "text": pa.array([], pa.string()),
        "lang": pa.array([], pa.string()), "source": pa.array([], pa.string()),
        "n_chars": pa.array([], pa.int64())}), f"{d}/documents.parquet")


def test_kmeans_empty_embeddings(tmp_path):
    """Zero-row embeddings: typed empty frame, not an np.stack crash."""
    from pdf_watermark_remover_ray.pipelines.similarity import kmeans_embeddings

    d = str(tmp_path)
    _write_empty(d)
    out = kmeans_embeddings(d)
    assert list(out.columns) == ["vec_id", "cluster"]
    assert len(out) == 0
    assert out["vec_id"].dtype == np.int64


def test_weighted_sample_empty_documents(tmp_path):
    from pdf_watermark_remover_ray.functions.sampling import (
        weighted_sample_documents)

    d = str(tmp_path)
    _write_empty(d)
    out = weighted_sample_documents(d)
    assert list(out.columns) == ["doc_id", "weight"]
    assert len(out) == 0


def test_enrich_in_emit_streams_whitelist():
    """ADVICE r4: naming "enrich" in emit_streams must validate, and
    stream_on("enrich") must honor the whitelist both ways."""
    from pdf_watermark_remover_ray.config import StreamConfig

    cfg = StreamConfig(emit_streams=("enrich",), enrich_stream=True)
    assert cfg.stream_on("enrich")
    cfg_off = StreamConfig(emit_streams=("sessions",), enrich_stream=True)
    assert not cfg_off.stream_on("enrich")


def test_reshard_layout_guards_enrich_flip():
    """Flipping enrich on/off (or changing its dimension) mid-resume-chain
    must be refused by the layout guard like a partition-count change."""
    from pdf_watermark_remover_ray.config import StreamConfig
    from pdf_watermark_remover_ray.state.reshard import (
        layout_matches, layout_of)

    base = StreamConfig(enrich_stream=False)
    layout = layout_of(base)
    assert layout_matches(layout, base)
    flipped = StreamConfig(enrich_stream=True)
    assert not layout_matches(layout, flipped)
    dim0 = StreamConfig(enrich_stream=True)
    layout_on = layout_of(dim0)
    other_dim = dim0.enrich_dim[:-1] or (("toolx", "groupx", 1.0),)
    dim1 = StreamConfig(enrich_stream=True, enrich_dim=tuple(other_dim))
    assert not layout_matches(layout_on, dim1)
    # old checkpoints without the keys stay accepted (additive evolution)
    legacy = {k: v for k, v in layout.items()
              if k not in ("enrich_stream", "enrich_dim")}
    assert layout_matches(legacy, flipped)


def test_reshard_layout_guards_dedup_hash_family():
    """The dedup seen-set stores raw text hashes, so a resume chain must
    refuse to switch hash families (polars seeded vs pandas siphash):
    pre-switch snapshots would never match post-switch re-hashes and every
    earlier text would silently un-deduplicate."""
    from pdf_watermark_remover_ray.config import StreamConfig
    from pdf_watermark_remover_ray.state.reshard import (
        _dedup_hash_family, layout_matches, layout_of)

    cfg = StreamConfig()
    layout = layout_of(cfg)
    assert layout["dedup_hash"] == _dedup_hash_family()
    assert layout_matches(layout, cfg)
    other = dict(layout, dedup_hash="pandas-siphash-v1"
                 if layout["dedup_hash"] != "pandas-siphash-v1"
                 else "polars-seeded-v1")
    assert not layout_matches(other, cfg)
    legacy = {k: v for k, v in layout.items() if k != "dedup_hash"}
    assert layout_matches(legacy, cfg)  # additive guard evolution


def test_levenshtein_band_matches_scalar():
    """The vectorized Ukkonen-banded multi-pair DP agrees with the scalar
    kernel: exact everywhere in uncapped mode; with caps, exact for
    distances ≤ cap and strictly above the cap otherwise (the clamp that
    the ``d <= budget`` filter relies on)."""
    import random

    from pdf_watermark_remover_ray.pipelines.dedup import (
        _levenshtein, _levenshtein_band)

    rng = random.Random(23)
    pairs = []
    for _ in range(300):
        n1, n2 = rng.randint(0, 50), rng.randint(0, 50)
        pairs.append(("".join(rng.choice("abcd") for _ in range(n1)),
                      "".join(rng.choice("abcd") for _ in range(n2))))
    A = [np.frombuffer(a.encode("utf-32-le"), np.uint32) for a, _ in pairs]
    B = [np.frombuffer(b.encode("utf-32-le"), np.uint32) for _, b in pairs]
    ref = np.array([_levenshtein(a, b) for a, b in pairs])
    assert (_levenshtein_band(A, B) == ref).all()
    caps = np.array([rng.randint(0, 20) for _ in pairs], dtype=float)
    capped = _levenshtein_band(A, B, caps=caps)
    exact = ref <= caps
    assert (capped[exact] == ref[exact]).all()
    assert (capped[~exact] > caps[~exact]).all()


def test_edit_dup_pairs_cluster_side(sf_dir):
    """The redesigned edit_dup_pairs (pairs never .to_pandas() on the
    driver; Bloom-pruned text co-shuffle; banded DP) still matches its
    SQL oracle."""
    want = duck_sql(sf_dir, Q.oracle_sql()["edit_dup_pairs"],
                    tables=("documents",))
    got = Q.queries()["edit_dup_pairs"](sf_dir)
    got = got.to_pandas() if hasattr(got, "to_pandas") else got
    assert len(want) > 0
    _cmp(got, want)


@pytest.mark.parametrize("name", ["ann_topk_ivf", "ann_topk_pq_indexed"])
def test_ann_training_replay_oracles(sf_dir, name):
    """The IVF/PQ training replays (queries._ivf_sql/_pq_sql) are
    hash-exact: the 9-dp fixed-point k-means keeps numpy and DuckDB
    bit-identical through all 10 Lloyd iterations (round-5 oracle gates
    for the former no-oracle whitelist entries; the clustered/inline
    variants are equality-pinned to these two elsewhere)."""
    want = duck_sql(sf_dir, Q.oracle_sql()[name], tables=("embeddings",))
    got = Q.queries()[name](sf_dir)
    got = got.to_pandas() if hasattr(got, "to_pandas") else got
    assert len(want) > 0
    _cmp(got, want)


def test_bm25_indexed_default_tmpdir_cleanup(sf_dir):
    """A default (index_dir=None) bm25_topk_indexed invocation must not
    leak its mkdtemp inverted index on disk (ADVICE r4)."""
    from pdf_watermark_remover_ray.pipelines.text import bm25_topk_indexed

    tmp_root = tempfile.gettempdir()
    before = set(glob.glob(os.path.join(tmp_root, "pwr_bm25_*")))
    out = bm25_topk_indexed(sf_dir)
    after = set(glob.glob(os.path.join(tmp_root, "pwr_bm25_*")))
    assert after - before == set()
    assert len(out) > 0  # the wrapper still returns the real result
