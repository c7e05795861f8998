"""Skew handling (FIXTURES.md F3): hot-key detection + reserved partitions."""

from __future__ import annotations

import json

import ray.data

from pdf_watermark_remover_ray.config import ScrubConfig, StreamConfig
from pdf_watermark_remover_ray.oracle import streaming_oracle
from pdf_watermark_remover_ray.pipelines.streaming import StreamingEngine
from pdf_watermark_remover_ray.sources.transcripts import (
    generate_transcripts,
    write_transcripts,
)
from pdf_watermark_remover_ray.stages.partition import detect_hot_keys

from test_streaming import assert_stream_equal, read_stream

NUM_FILES = 8
EPOCH_FILES = 2


def test_hot_keys_reserved_partitions(tmp_path):
    table = generate_transcripts(n_convs=40, mean_turns=10, seed=21,
                                 hot_keys=3, hot_frac=0.3)
    paths = write_transcripts(table, str(tmp_path / "in"), num_files=NUM_FILES)

    ds = ray.data.from_arrow(table)
    hot = detect_hot_keys(ds, frac_threshold=0.05, max_keys=4)
    assert len(hot) >= 3, hot
    assert set(hot[:3]) == {"c000000", "c000001", "c000002"}

    cfg = StreamConfig(num_partitions=4, hot_keys=tuple(hot),
                       scrub=ScrubConfig())
    out = str(tmp_path / "out")
    res = StreamingEngine(paths, out, cfg, epoch_files=EPOCH_FILES).run()

    # correctness unchanged under hot-key routing
    golden = streaming_oracle(table, NUM_FILES, EPOCH_FILES, cfg)
    assert_stream_equal(
        read_stream(out, "turns"), golden["turns"],
        ["conv_id", "turn_idx", "role", "text", "tool", "ts", "modified"],
    )
    assert_stream_equal(
        read_stream(out, "sessions"), golden["sessions"],
        ["conv_id", "session_start_us", "session_end_us", "n_turns"],
    )

    # the reserved partitions actually absorbed the hot conversations
    rows_per_part = {}
    for m in res["epochs"]:
        for p in m["partitions"]:
            rows_per_part[p["partition"]] = rows_per_part.get(p["partition"], 0) \
                + p["rows"]
    reserved = {cfg.num_partitions + i for i in range(len(hot))}
    reserved_rows = sum(rows_per_part.get(p, 0) for p in reserved)
    total = sum(rows_per_part.values())
    assert reserved_rows / total > 0.2, rows_per_part
    # hot turns all landed on reserved partitions: no regular partition holds
    # a hot conv (turns stream carries lineage "part-XXXXX/...")
    turns = read_stream(out, "turns")
    hot_lineage = turns[turns["conv_id"].isin(hot)]["lineage"].unique()
    for lin in hot_lineage:
        pid = int(lin.split("/")[0].split("-")[1])
        assert pid in reserved


def test_auto_hot_key_detection_persists(tmp_path):
    """auto_hot_keys: the engine samples the arrival head, reserves
    partitions for hot conversations, persists the choice write-once, and a
    resumed engine reuses the identical keys; outputs stay golden."""
    table = generate_transcripts(n_convs=40, mean_turns=10, seed=21,
                                 hot_keys=3, hot_frac=0.3)
    paths = write_transcripts(table, str(tmp_path / "in"), num_files=NUM_FILES)
    cfg = StreamConfig(num_partitions=4, scrub=ScrubConfig())
    out = str(tmp_path / "out_auto")
    eng = StreamingEngine(paths, out, cfg, epoch_files=EPOCH_FILES,
                          auto_hot_keys=True, hot_key_sample_files=NUM_FILES)
    assert set(eng.cfg.hot_keys) >= {"c000000", "c000001", "c000002"}
    eng.run(kill_after_epoch=1)

    # resume: detection file is reused verbatim (no re-sampling drift)
    marker = json.load(open(f"{out}/_hot_keys.json"))
    eng2 = StreamingEngine(paths, out, cfg, epoch_files=EPOCH_FILES,
                           auto_hot_keys=True, hot_key_sample_files=1)
    assert list(eng2.cfg.hot_keys) == marker["hot_keys"]
    eng2.run()

    golden = streaming_oracle(table, NUM_FILES, EPOCH_FILES, eng.cfg)
    assert_stream_equal(
        read_stream(out, "turns"), golden["turns"],
        ["conv_id", "turn_idx", "role", "text", "tool", "ts", "modified"],
    )
    assert_stream_equal(
        read_stream(out, "matches"), golden["matches"],
        ["conv_id", "user_turn_idx", "tool_turn_idx", "tool", "dt_us"],
    )


def test_batch_partitioned_map_hot_key_isolation(tmp_path):
    """Batch twin of the streaming reserved-partition routing: hot keys get
    their own partitions and every keyed batch operator's output is
    unchanged under the re-routing."""
    import ray.data

    from pdf_watermark_remover_ray.stages.cep import sequence_matches
    from pdf_watermark_remover_ray.stages.windows import session_windows

    table = generate_transcripts(n_convs=30, mean_turns=10, seed=5,
                                 hot_keys=2, hot_frac=0.4)
    ds = ray.data.from_arrow(table.drop_columns(["arrival_us"]))
    hot = detect_hot_keys(ds, frac_threshold=0.05, max_keys=2)
    assert len(hot) == 2

    base_s = session_windows(ds, 30_000_000, num_partitions=4).to_pandas()
    hot_s = session_windows(ds, 30_000_000, num_partitions=4,
                            hot_keys=tuple(hot)).to_pandas()
    cols = list(base_s.columns)
    assert base_s.sort_values(cols).reset_index(drop=True).equals(
        hot_s.sort_values(cols).reset_index(drop=True))

    pat = ("user", "tool", "assistant")
    base_c = sequence_matches(ds, pat, 86_400_000_000, num_partitions=4) \
        .to_pandas()
    hot_c = sequence_matches(ds, pat, 86_400_000_000, num_partitions=4,
                             hot_keys=tuple(hot)).to_pandas()
    ccols = list(base_c.columns)
    assert base_c.sort_values(ccols).reset_index(drop=True).equals(
        hot_c.sort_values(ccols).reset_index(drop=True))
