"""Round-5 session 2: multi-node placement hooks (MULTINODE.md) — SPREAD
scheduling of pinned actors must be a pure placement concern, invisible in
results, and toggleable."""

from __future__ import annotations

import glob

import pandas as pd
import pyarrow.parquet as pq

import pyarrow as pa

from conftest import assert_frames_match, duck_sql

from pdf_watermark_remover_ray.config import StreamConfig
from pdf_watermark_remover_ray.pipelines.streaming import StreamingEngine
from pdf_watermark_remover_ray.sources.transcripts import (
    generate_transcripts,
    write_transcripts,
)


def test_pagerank_pinned_spread_toggle_invariant(sf_dir):
    """spread=True (SPREAD placement, the multi-node default) and
    spread=False (Ray default packing) are placement-only: identical
    output frame."""
    from pdf_watermark_remover_ray.pipelines.relational import (
        customer_supplier_pagerank_pinned)

    a = customer_supplier_pagerank_pinned(sf_dir, spread=True)
    b = customer_supplier_pagerank_pinned(sf_dir, spread=False)
    pd.testing.assert_frame_equal(a.reset_index(drop=True),
                                  b.reset_index(drop=True))


def test_event_user_cube_matches_oracle(sf_dir):
    """Distributed grouping sets over a HIGH-cardinality key: all four CUBE
    sets ride one shuffle; result matches DuckDB's GROUP BY CUBE."""
    from pdf_watermark_remover_ray.pipelines.relational import (
        event_user_cube, event_user_cube_oracle_sql)

    got = event_user_cube(sf_dir).to_pandas()
    want = duck_sql(sf_dir, event_user_cube_oracle_sql())
    assert_frames_match(got, want)
    # the finest set dominates; ALL/ALL grand total appears exactly once
    assert (got["event_type"].eq("ALL") & got["user_key"].eq("ALL")).sum() == 1


def test_event_user_cube_all_null_batch(tmp_path):
    """Over zero VALID rows the () grouping set still aggregates — SQL
    emits exactly one (ALL, ALL, 0) grand-total row (verified against the
    registered DuckDB oracle on the same input), and a null-carrying batch
    must not corrupt int64 user_ids above 2^53 (to_pandas null-promotion
    to float64)."""
    from pdf_watermark_remover_ray.pipelines.relational import (
        event_user_cube, event_user_cube_oracle_sql)

    big = 9007199254740993  # 2^53 + 1: survives int64, not float64
    d = tmp_path / "sf_null"
    d.mkdir()
    t = pa.table({"event_id": pa.array([1, 2], pa.int64()),
                  "ts": pa.array([0, 0], pa.int64()),
                  "user_id": pa.array([None, None], pa.int64()),
                  "event_type": pa.array([None, None], pa.string()),
                  "value": pa.array([0.0, 0.0]),
                  "props": pa.array(["", ""])})
    pq.write_table(t, str(d / "events.parquet"))
    got = event_user_cube(str(d)).to_pandas()
    want = duck_sql(str(d), event_user_cube_oracle_sql(), tables=("events",))
    assert_frames_match(got, want)
    assert len(got) == 1 and got["n"].iloc[0] == 0

    d2 = tmp_path / "sf_big"
    d2.mkdir()
    t2 = pa.table({"event_id": pa.array([1, 2], pa.int64()),
                   "ts": pa.array([0, 0], pa.int64()),
                   "user_id": pa.array([big, None], pa.int64()),
                   "event_type": pa.array(["click", None], pa.string()),
                   "value": pa.array([0.0, 0.0]),
                   "props": pa.array(["", ""])})
    pq.write_table(t2, str(d2 / "events.parquet"))
    got2 = event_user_cube(str(d2)).to_pandas()
    want2 = duck_sql(str(d2), event_user_cube_oracle_sql(), tables=("events",))
    assert_frames_match(got2, want2)
    assert str(big) in set(got2["user_key"])


def test_streaming_spread_toggle_invariant(tmp_path):
    """StreamingEngine actor_spread on/off: identical committed turns stream
    (placement never leaks into routing, folds, or emission order)."""
    table = generate_transcripts(n_convs=12, mean_turns=6, seed=23,
                                 late_frac=0.1)
    d = tmp_path / "in"
    d.mkdir()
    paths = write_transcripts(table, str(d), num_files=4, split_by="ts")
    cfg = StreamConfig(num_partitions=3)

    frames = {}
    for spread in (True, False):
        out = str(tmp_path / f"out_{spread}")
        res = StreamingEngine(paths, out, cfg, epoch_files=2,
                              actor_spread=spread).run()
        assert res["all_succeeded"] is True
        files = sorted(glob.glob(f"{out}/data/turns/epoch=*/part-*.parquet"))
        frames[spread] = pd.concat(
            [pq.read_table(f).to_pandas() for f in files], ignore_index=True
        ).sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
        # committed markers carry the per-stream close-time breakdown
        import json
        marker = json.load(open(f"{out}/_epochs/epoch-0.json"))
        part0 = marker["partitions"][0]
        assert "stream_s" in part0 and "sessions" in part0["stream_s"]

    pd.testing.assert_frame_equal(frames[True], frames[False])
