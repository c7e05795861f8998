"""Streaming engine conformance: golden equality vs the single-process oracle,
exactly-once under kill/resume, idempotent replay."""

from __future__ import annotations

import glob

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

from pdf_watermark_remover_ray.config import ScrubConfig, StreamConfig
from pdf_watermark_remover_ray.oracle import streaming_oracle
from pdf_watermark_remover_ray.pipelines.streaming import StreamingEngine
from pdf_watermark_remover_ray.sources.transcripts import (
    generate_transcripts,
    write_transcripts,
)

NUM_FILES = 8
EPOCH_FILES = 2

CFG = StreamConfig(
    num_partitions=4,
    lateness_us=15_000_000,
    session_gap_us=30_000_000,
    join_gap_us=30_000_000,
    tumbling_us=60_000_000,
    scrub=ScrubConfig(),
)


@pytest.fixture(scope="module")
def fixture(tmp_path_factory):
    table = generate_transcripts(n_convs=60, mean_turns=12, seed=11, late_frac=0.10)
    d = tmp_path_factory.mktemp("stream_in")
    paths = write_transcripts(table, str(d), num_files=NUM_FILES, split_by="ts")
    golden = streaming_oracle(table, NUM_FILES, EPOCH_FILES, CFG)
    return table, paths, golden


def read_stream(out_dir: str, stream: str) -> pd.DataFrame:
    files = sorted(glob.glob(f"{out_dir}/data/{stream}/epoch=*/part-*.parquet"))
    frames = [pq.read_table(f).to_pandas() for f in files]
    return pd.concat(frames, ignore_index=True) if frames else pd.DataFrame()


def assert_stream_equal(got: pd.DataFrame, want: pd.DataFrame, cols: list[str]):
    g = got[cols].sort_values(cols).reset_index(drop=True)
    w = want[cols].sort_values(cols).reset_index(drop=True)
    assert len(g) == len(w), (len(g), len(w))
    for c in cols:
        gv, wv = g[c].to_numpy(), w[c].to_numpy()
        assert (pd.isna(gv) == pd.isna(wv)).all(), c
        ok = pd.isna(gv) | (gv.astype(str) == wv.astype(str))
        assert ok.all(), (c, g.loc[~ok, cols].head(), w.loc[~ok, cols].head())


def _check_outputs(out_dir: str, golden: dict):
    assert_stream_equal(
        read_stream(out_dir, "turns"), golden["turns"],
        ["conv_id", "turn_idx", "role", "text", "tool", "ts", "modified"],
    )
    assert_stream_equal(
        read_stream(out_dir, "late"), golden["late"],
        ["conv_id", "turn_idx", "ts_us", "epoch"],
    )
    assert_stream_equal(
        read_stream(out_dir, "sessions"), golden["sessions"],
        ["conv_id", "session_start_us", "session_end_us", "n_turns"],
    )
    assert_stream_equal(
        read_stream(out_dir, "windows"), golden["windows"],
        ["conv_id", "window_start_us", "n_turns"],
    )
    assert_stream_equal(
        read_stream(out_dir, "wstats"), golden["wstats"],
        ["conv_id", "window_start_us", "n_turns", "sum_chars", "min_chars",
         "max_chars"],
    )
    assert_stream_equal(
        read_stream(out_dir, "sliding"), golden["sliding"],
        ["conv_id", "window_start_us", "n_turns"],
    )
    assert_stream_equal(
        read_stream(out_dir, "matches"), golden["matches"],
        ["conv_id", "user_turn_idx", "tool_turn_idx", "tool", "dt_us"],
    )
    assert_stream_equal(
        read_stream(out_dir, "dedup"), golden["dedup"],
        ["conv_id", "turn_idx"],
    )
    assert_stream_equal(
        read_stream(out_dir, "wdistinct"), golden["wdistinct"],
        ["conv_id", "window_start_us", "n_tools"],
    )
    assert_stream_equal(
        read_stream(out_dir, "wtopk"), golden["wtopk"],
        ["conv_id", "window_start_us", "tool", "n", "rank"],
    )
    assert_stream_equal(
        read_stream(out_dir, "cep"), golden["cep"],
        ["conv_id", "turn_idx", "dt_us"],
    )
    assert_stream_equal(
        read_stream(out_dir, "cepk"), golden["cepk"],
        ["conv_id", "turn_idx", "n_tools", "dt_us"],
    )
    assert_stream_equal(
        read_stream(out_dir, "timeouts"), golden["timeouts"],
        ["conv_id", "turn_idx", "deadline_us"],
    )


def test_full_run_matches_oracle(fixture, tmp_path):
    table, paths, golden = fixture
    out = str(tmp_path / "out")
    eng = StreamingEngine(paths, out, CFG, epoch_files=EPOCH_FILES)
    res = eng.run()
    assert len(res["epochs"]) == eng.n_input_epochs + 1
    assert len(golden["late"]) > 0, "fixture must exercise the late-drop path"
    assert golden["turns"]["modified"].sum() > 0, "fixture must exercise the scrub path"
    assert len(golden["cep"]) > 0, "fixture must exercise the CEP match path"
    assert len(golden["cepk"]) > 0, "fixture must exercise the Kleene CEP path"
    assert (golden["cepk"]["n_tools"] > 1).any(), \
        "fixture must contain a multi-tool Kleene run"
    _check_outputs(out, golden)
    # watermark strictly monotone across markers
    wms = [m["watermark_us"] for m in res["epochs"]]
    assert wms == sorted(wms)


def test_kill_after_epoch_resume_exactly_once(fixture, tmp_path):
    table, paths, golden = fixture
    out = str(tmp_path / "out_kill")
    eng = StreamingEngine(paths, out, CFG, epoch_files=EPOCH_FILES)
    res = eng.run(kill_after_epoch=1)
    assert res["killed_after"] == 1
    # fresh engine (fresh actors) resumes from the markers
    eng2 = StreamingEngine(paths, out, CFG, epoch_files=EPOCH_FILES)
    res2 = eng2.run()
    assert res2["epochs"][0]["epoch"] == 2
    _check_outputs(out, golden)


def test_kill_mid_epoch_resume_exactly_once(fixture, tmp_path):
    table, paths, golden = fixture
    out = str(tmp_path / "out_mid")
    eng = StreamingEngine(paths, out, CFG, epoch_files=EPOCH_FILES)
    res = eng.run(kill_mid_epoch=2)
    assert res["killed_mid"] == 2
    eng2 = StreamingEngine(paths, out, CFG, epoch_files=EPOCH_FILES)
    res2 = eng2.run()
    assert res2["epochs"][0]["epoch"] == 2  # epoch 2 replayed from scratch
    _check_outputs(out, golden)


def test_replay_completed_run_is_noop(fixture, tmp_path):
    table, paths, golden = fixture
    out = str(tmp_path / "out_replay")
    StreamingEngine(paths, out, CFG, epoch_files=EPOCH_FILES).run()
    before = read_stream(out, "turns")
    res = StreamingEngine(paths, out, CFG, epoch_files=EPOCH_FILES).run()
    assert res.get("resumed_done") is True
    after = read_stream(out, "turns")
    pd.testing.assert_frame_equal(
        before.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True),
        after.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True),
    )


def test_partition_parallelism_invariance(fixture, tmp_path):
    """Output row multiset is invariant under partition count (SURVEY.md §5.3)."""
    table, paths, golden = fixture
    out = str(tmp_path / "out_p2")
    cfg2 = StreamConfig(
        num_partitions=2,
        lateness_us=CFG.lateness_us,
        session_gap_us=CFG.session_gap_us,
        join_gap_us=CFG.join_gap_us,
        tumbling_us=CFG.tumbling_us,
        scrub=CFG.scrub,
    )
    StreamingEngine(paths, out, cfg2, epoch_files=EPOCH_FILES).run()
    _check_outputs(out, golden)


def test_corrupt_file_failure_isolation(fixture, tmp_path):
    """Reference continue-on-failure semantics: a corrupt input file is
    dead-lettered in the epoch marker; every other file still processes."""
    table, paths, golden = fixture
    import shutil

    d = tmp_path / "in_corrupt"
    d.mkdir()
    new_paths = []
    for p in paths:
        q = d / p.split("/")[-1]
        shutil.copy(p, q)
        new_paths.append(str(q))
    bad = d / "part-00099.parquet"
    bad.write_bytes(b"this is not a parquet file")
    new_paths.append(str(bad))

    out = str(tmp_path / "out_corrupt")
    res = StreamingEngine(new_paths, out, CFG, epoch_files=EPOCH_FILES).run()
    assert res["all_succeeded"] is False
    assert res["failed_files"] == [str(bad)]
    # all good files' rows still flowed through
    total_rows = sum(m["rows"] for m in res["epochs"])
    assert total_rows == len(table)


def test_empty_input_run(tmp_path):
    """S3 empty-source guard: zero input files → flush epoch only, clean run."""
    out = str(tmp_path / "out_empty")
    res = StreamingEngine([], out, CFG, epoch_files=EPOCH_FILES).run()
    assert res["all_succeeded"] is True
    assert len(res["epochs"]) == 1  # just the flush epoch
    assert res["epochs"][0]["rows"] == 0


def test_exactly_once_under_real_task_retries(fixture, tmp_path):
    """Fault injection: every epoch's first route task ingests half a file,
    then crashes; Ray retries it (retry_exceptions). The keyed idempotent
    ingest + deterministic staged names must still produce the golden
    outputs exactly once."""
    from dataclasses import replace

    table, paths, golden = fixture
    out = str(tmp_path / "out_retry")
    cfg = replace(CFG, fault_inject_dir=str(tmp_path / "faults"))
    res = StreamingEngine(paths, out, cfg, epoch_files=EPOCH_FILES).run()
    assert res["all_succeeded"] is True
    import glob as _g

    # one injected failure per route task (= per input file)
    assert len(_g.glob(str(tmp_path / "faults" / "*.failed"))) == NUM_FILES
    _check_outputs(out, golden)


def test_epoch_compaction(fixture, tmp_path):
    """S6 output compaction: many per-task files -> one, same rows."""
    table, paths, golden = fixture
    out = str(tmp_path / "out_compact")
    StreamingEngine(paths, out, CFG, epoch_files=EPOCH_FILES).run()
    from pdf_watermark_remover_ray.sinks.parquet import EpochSink

    sink = EpochSink(out)
    before = read_stream(out, "turns")
    for e in range(4):
        sink.compact_epoch("turns", e)
    files = glob.glob(f"{out}/data/turns/epoch=*/part-*.parquet")
    assert len(files) == 4  # one file per compacted input epoch (flush epoch
    # emits no turns — they are route-time emissions)
    after = read_stream(out, "turns")
    pd.testing.assert_frame_equal(
        before.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True),
        after.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True),
    )


def test_cross_epoch_compaction_and_resume(fixture, tmp_path):
    """Stream-level re-layout (compact_stream): row multiset identical,
    crash between publish and source removal recovers without duplicates,
    and a killed run compacted mid-way still resumes to the golden output."""
    import os
    import shutil

    from pdf_watermark_remover_ray.sinks.parquet import EpochSink

    table, paths, golden = fixture

    # -- multiset identity + convergence to few files
    out = str(tmp_path / "out_xc")
    StreamingEngine(paths, out, CFG, epoch_files=EPOCH_FILES).run()
    sink = EpochSink(out)
    before = read_stream(out, "turns")
    n_before = len(glob.glob(f"{out}/data/turns/epoch=*/part-*.parquet"))
    stats = sink.compact_stream("turns", target_bytes=1 << 30)
    assert stats["files_in"] == n_before and stats["files_out"] == 1
    files = glob.glob(f"{out}/data/turns/epoch=*/part-*.parquet")
    assert len(files) == 1 and f"epoch={stats['lo']}-{stats['hi']}" in files[0]
    after = read_stream(out, "turns")
    pd.testing.assert_frame_equal(
        before.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True),
        after.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True),
    )
    # re-running is a no-op (single source dir)
    assert sink.compact_stream("turns", target_bytes=1 << 30)["rows"] == 0

    # -- tiny target_bytes still packs >=1 file per group and loses nothing
    out2 = str(tmp_path / "out_xc2")
    StreamingEngine(paths, out2, CFG, epoch_files=EPOCH_FILES).run()
    sink2 = EpochSink(out2)
    b2 = read_stream(out2, "turns")
    st2 = sink2.compact_stream("turns", target_bytes=1)
    assert st2["files_out"] == st2["files_in"]  # 1-byte target: 1 file/group
    pd.testing.assert_frame_equal(
        b2.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True),
        read_stream(out2, "turns")
        .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True),
    )

    # -- crash between publish and source removal: combined dir exists AND
    # covered epoch dirs still exist -> recovery drops the covered sources
    root = f"{out2}/data/turns"
    combined = [d for d in os.listdir(root) if "-" in d][0]
    lo, hi = EpochSink._parse_epoch_dir(combined)
    shutil.copytree(os.path.join(root, combined),
                    os.path.join(root, f"epoch={lo}"))
    sink2.recover_stream_compaction("turns")
    assert not os.path.isdir(os.path.join(root, f"epoch={lo}"))
    pd.testing.assert_frame_equal(
        b2.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True),
        read_stream(out2, "turns")
        .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True),
    )

    # -- resume safety: kill after epoch 1, compact the committed prefix,
    # resume -> golden output (markers untouched, combined dir coexists
    # with the epochs the resumed run appends)
    out3 = str(tmp_path / "out_xc3")
    StreamingEngine(paths, out3, CFG, epoch_files=EPOCH_FILES) \
        .run(kill_after_epoch=1)
    sink3 = EpochSink(out3)
    st3 = sink3.compact_stream("turns")
    assert st3["hi"] == sink3.last_contiguous_epoch()
    res = StreamingEngine(paths, out3, CFG, epoch_files=EPOCH_FILES).run()
    assert res["all_succeeded"] is True
    _check_outputs(out3, golden)


def test_sliding_non_divisible_size_slide(fixture, tmp_path):
    """gcd-bucket rollup: sliding output must match the per-event oracle when
    size is NOT a multiple of slide (round-1 bug: slide-bucket rollup
    over-counted any non-divisible config)."""
    table, paths, golden_unused = fixture
    cfg = StreamConfig(
        num_partitions=4,
        lateness_us=CFG.lateness_us,
        session_gap_us=CFG.session_gap_us,
        join_gap_us=CFG.join_gap_us,
        tumbling_us=CFG.tumbling_us,
        sliding_size_us=90_000_000,   # 90 s
        sliding_slide_us=60_000_000,  # 60 s -> gcd bucket 30 s
        scrub=CFG.scrub,
    )
    assert cfg.sliding_spec.bucket_us == 30_000_000
    assert cfg.sliding_spec.n_windows_per_bucket() == 2
    golden = streaming_oracle(table, NUM_FILES, EPOCH_FILES, cfg)
    out = str(tmp_path / "out_nondiv")
    StreamingEngine(paths, out, cfg, epoch_files=EPOCH_FILES).run()
    assert_stream_equal(
        read_stream(out, "sliding"), golden["sliding"],
        ["conv_id", "window_start_us", "n_turns"],
    )


def test_config_preflight_validation():
    """P2 analog: a bad StreamConfig raises at construction, before any work."""
    with pytest.raises(ValueError, match="num_partitions"):
        StreamConfig(num_partitions=0)
    with pytest.raises(ValueError, match="lateness_us"):
        StreamConfig(lateness_us=-1)
    with pytest.raises(ValueError, match="sliding_slide_us"):
        StreamConfig(sliding_slide_us=0)
    with pytest.raises(ValueError, match="route_batch_rows"):
        StreamConfig(route_batch_rows=0)


def test_engine_preflight_validation(fixture, tmp_path):
    """P2/P3 analog: missing files, wrong suffix, or a missing destination are
    rejected by StreamingEngine.__init__ — not dead-lettered at route time."""
    table, paths, golden = fixture
    with pytest.raises(ValueError, match="missing or not"):
        StreamingEngine([str(tmp_path / "nope.parquet")], str(tmp_path / "o"), CFG)
    bad = tmp_path / "data.csv"
    bad.write_text("a,b\n1,2\n")
    with pytest.raises(ValueError, match="missing or not"):
        StreamingEngine([str(bad)], str(tmp_path / "o"), CFG)
    with pytest.raises(ValueError, match="output directory"):
        StreamingEngine(paths, "", CFG)
    with pytest.raises(ValueError, match="epoch_files"):
        StreamingEngine(paths, str(tmp_path / "o"), CFG, epoch_files=0)


def test_midfile_failure_all_or_nothing(tmp_path, fixture):
    """A file failing MID-read (after batches were staged and ingested) must
    contribute NOTHING — outputs equal a run where that file is empty."""
    import shutil
    from dataclasses import replace

    table, paths, golden = fixture
    victim = paths[3]
    cfg = replace(CFG, fault_midfile_file=victim.split("/")[-1],
                  route_batch_rows=20)
    outA = str(tmp_path / "outA")
    resA = StreamingEngine(paths, outA, cfg, epoch_files=EPOCH_FILES).run()
    assert resA["failed_files"] == [victim]
    assert resA["all_succeeded"] is False

    d = tmp_path / "in_empty"
    d.mkdir()
    pathsB = []
    for p in paths:
        q = d / p.split("/")[-1]
        if p == victim:
            pq.write_table(pq.read_table(p).schema.empty_table(), str(q))
        else:
            shutil.copy(p, q)
        pathsB.append(str(q))
    outB = str(tmp_path / "outB")
    StreamingEngine(pathsB, outB, CFG, epoch_files=EPOCH_FILES).run()

    checks = [
        ("turns", ["conv_id", "turn_idx", "role", "text", "tool", "ts", "modified"]),
        ("late", ["conv_id", "turn_idx", "ts_us", "epoch"]),
        ("sessions", ["conv_id", "session_start_us", "session_end_us", "n_turns"]),
        ("windows", ["conv_id", "window_start_us", "n_turns"]),
        ("sliding", ["conv_id", "window_start_us", "n_turns"]),
        ("matches", ["conv_id", "user_turn_idx", "tool_turn_idx", "tool", "dt_us"]),
        ("wdistinct", ["conv_id", "window_start_us", "n_tools"]),
        ("wtopk", ["conv_id", "window_start_us", "tool", "n", "rank"]),
        ("dedup", ["conv_id", "turn_idx"]),
    ]
    for stream, cols in checks:
        assert_stream_equal(read_stream(outA, stream), read_stream(outB, stream), cols)


def test_resume_across_delta_chain(fixture, tmp_path):
    """Kill/resume with delta snapshots crossing a full boundary
    (snapshot_full_every=3 over 5 epochs: full@0, delta@1-2, full@3,
    delta@4) still reproduces the golden outputs exactly."""
    from dataclasses import replace

    table, paths, golden = fixture
    cfg = replace(CFG, snapshot_full_every=3)
    out = str(tmp_path / "out_chain")
    res = StreamingEngine(paths, out, cfg, epoch_files=EPOCH_FILES).run(
        kill_after_epoch=2)
    assert res["killed_after"] == 2
    StreamingEngine(paths, out, cfg, epoch_files=EPOCH_FILES).run(
        kill_after_epoch=3)
    StreamingEngine(paths, out, cfg, epoch_files=EPOCH_FILES).run()
    _check_outputs(out, golden)


def test_live_progress_and_destination_defaulting(fixture, tmp_path):
    """ST3 tail: the live progress snapshot survives the run and accounts
    every routed row; S8 tail: scrub_file derives its destination."""
    import os
    import time

    from pdf_watermark_remover_ray.api import resolve_output_path, scrub_file

    table, paths, golden = fixture
    out = str(tmp_path / "out_prog")
    eng = StreamingEngine(paths, out, CFG, epoch_files=EPOCH_FILES)
    eng.run()
    deadline = time.monotonic() + 10
    total = -1
    while time.monotonic() < deadline:
        prog = eng.progress()
        total = sum(c["rows"] for c in prog.values())
        if total == len(table):
            break
        time.sleep(0.2)
    assert total == len(table)
    assert sum(c["files"] for c in prog.values()) == NUM_FILES

    # destination defaulting (reference ui/app_ui.py:309-321 semantics)
    assert resolve_output_path("/a/b/in.parquet", None) == "/a/b/in_scrubbed.parquet"
    assert resolve_output_path("/a/b/in.parquet", "") == "/a/b/in_scrubbed.parquet"
    d = tmp_path / "dest"
    d.mkdir()
    assert resolve_output_path("/a/b/in.parquet", str(d)) == str(d / "in.parquet")
    assert resolve_output_path("/a/b/in.parquet", "/x/y.parquet") == "/x/y.parquet"
    assert scrub_file(paths[0], str(d), "hello") is True
    assert os.path.exists(d / os.path.basename(paths[0]))
    assert scrub_file(paths[0], None, "hello") is True
    derived = paths[0].replace(".parquet", "_scrubbed.parquet")
    assert os.path.exists(derived)
    os.remove(derived)


def test_metrics_include_per_partition_lag(fixture, tmp_path):
    """metrics_df carries per-(epoch, partition) throughput and watermark-lag
    columns (the north rule's per-partition metrics)."""
    table, paths, golden = fixture
    out = str(tmp_path / "out_metrics")
    eng = StreamingEngine(paths, out, CFG, epoch_files=EPOCH_FILES)
    eng.run()
    df = eng.metrics_df()
    assert {"epoch", "partition", "rows", "rows_per_s", "wm_lag_us",
            "close_s", "fold_s", "emit_s", "snap_s",
            "stream_s_sessions", "stream_s_dedup"} <= set(df.columns)
    # lag = watermark - partition max ts; bounded below by -lateness (a
    # partition at the event-time head leads the watermark by exactly that)
    lags = df[df["rows"] > 0]["wm_lag_us"].dropna()
    assert len(lags) > 0
    assert (lags >= -CFG.lateness_us).all()
    assert len(df) == (eng.n_input_epochs + 1) * CFG.total_partitions


def test_engine_compact_all(fixture, tmp_path):
    """Engine-level compaction: one file per (stream, epoch) afterwards,
    identical rows."""
    import glob as _g

    table, paths, golden = fixture
    out = str(tmp_path / "out_compact_all")
    eng = StreamingEngine(paths, out, CFG, epoch_files=EPOCH_FILES)
    eng.run()
    before = read_stream(out, "turns")
    res = eng.compact()
    assert any(v > 0 for v in res.values())
    for d in _g.glob(f"{out}/data/*/epoch=*"):
        assert len(_g.glob(f"{d}/part-*.parquet")) == 1
    after = read_stream(out, "turns")
    pd.testing.assert_frame_equal(
        before.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True),
        after.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True))


def test_kill_at_every_epoch_chain_resume(fixture, tmp_path):
    """Chaos chain: kill after EVERY epoch in turn (and mid-epoch at each),
    resuming each time with a fresh engine; the final outputs must equal the
    golden run exactly — exactly-once survives arbitrary kill points."""
    table, paths, golden = fixture
    out = str(tmp_path / "out_chaos")
    n = StreamingEngine(paths, out, CFG, epoch_files=EPOCH_FILES).n_input_epochs
    for e in range(n + 1):
        StreamingEngine(paths, out, CFG, epoch_files=EPOCH_FILES).run(
            kill_mid_epoch=e if e < n else None,
            kill_after_epoch=e)
    StreamingEngine(paths, out, CFG, epoch_files=EPOCH_FILES).run()
    _check_outputs(out, golden)


def test_job_entry_point(fixture, tmp_path):
    """jobs/run_stream.py (the `ray job submit` payload) runs standalone in a
    fresh process, resumes idempotently, and reports a JSON summary."""
    import json as _json
    import os
    import subprocess
    import sys

    table, paths, golden = fixture
    out = str(tmp_path / "out_job")
    indir = os.path.dirname(paths[0])
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, RAY_ADDRESS="local",
               PYTHONPATH=repo + os.pathsep + os.environ.get("PYTHONPATH", ""))
    cmd = [sys.executable, os.path.join(repo, "jobs", "run_stream.py"),
           "--input", f"{indir}/*.parquet", "--out", out,
           "--epoch-files", str(EPOCH_FILES), "--partitions", "4",
           "--lateness-us", str(CFG.lateness_us),
           "--session-gap-us", str(CFG.session_gap_us),
           "--join-gap-us", str(CFG.join_gap_us),
           "--tumbling-us", str(CFG.tumbling_us),
           # full stream set + a never-firing cap: exercises the flag
           # plumbing while keeping outputs identical to the golden
           "--emit-streams", "sessions,windows,wstats,sliding,wdistinct,"
                             "wtopk,matches,timeouts,cep,cepk,dedup",
           "--max-open-rows-per-key", "1000000",
           "--compact", "--strict"]
    proc = subprocess.run(cmd, env=env, capture_output=True, text=True,
                          timeout=300)
    assert proc.returncode == 0, proc.stderr[-2000:]
    summary = _json.loads(proc.stdout.strip().splitlines()[-1])
    assert summary["rows"] == len(table) and summary["all_succeeded"]
    _check_outputs(out, golden)
    # rerun = resume no-op
    proc2 = subprocess.run(cmd, env=env, capture_output=True, text=True,
                           timeout=300)
    assert proc2.returncode == 0
    s2 = _json.loads(proc2.stdout.strip().splitlines()[-1])
    assert s2["resumed_done"] is True and s2["rows"] == 0


def test_streaming_dedup_cross_epoch_and_resume(tmp_path):
    """Heavy planted duplicates: texts repeat WITHIN and ACROSS epochs; the
    seen-set must suppress every later occurrence (cross-epoch memory),
    survive a kill/resume through the snapshot chain, and pick the
    arrival-order-free winner (min (conv_id, turn_idx) in the first epoch)."""
    import pyarrow as pa

    table = generate_transcripts(n_convs=50, mean_turns=10, seed=23, late_frac=0.05)
    # cycle the text column through 20 distinct strings over the whole run:
    # every epoch re-sees most of them
    texts = [f"dup text {i % 20} payload" for i in range(len(table))]
    table = table.set_column(
        table.schema.get_field_index("text"), "text", pa.array(texts))
    d = tmp_path / "dup_in"
    paths = write_transcripts(table, str(d), num_files=NUM_FILES, split_by="ts")
    golden = streaming_oracle(table, NUM_FILES, EPOCH_FILES, CFG)
    assert len(golden["dedup"]) == 20  # all duplicates collapsed
    out = str(tmp_path / "dup_out")
    eng = StreamingEngine(paths, out, CFG, epoch_files=EPOCH_FILES)
    assert eng.run(kill_after_epoch=1)["killed_after"] == 1
    StreamingEngine(paths, out, CFG, epoch_files=EPOCH_FILES).run()
    got = read_stream(out, "dedup")
    assert_stream_equal(got, golden["dedup"], ["conv_id", "turn_idx"])
    # every winner sits in the earliest epoch that contains its text
    turns = read_stream(out, "turns")
    winner_epochs = got.merge(turns[["conv_id", "turn_idx", "epoch"]],
                              on=["conv_id", "turn_idx"])
    first_epoch = turns.assign(k=turns["text"].fillna("")) \
        .groupby("k")["epoch"].min()
    assert len(winner_epochs) == 20
    assert sorted(winner_epochs["epoch"]) == sorted(first_epoch)


def test_prune_state_then_resume(fixture, tmp_path):
    """Checkpoint GC: pruning snapshots below the last all-full epoch must
    not break the delta-chain restore of a killed run."""
    from dataclasses import replace

    table, paths, golden = fixture
    cfg = replace(CFG, snapshot_full_every=2)
    out = str(tmp_path / "out_prune")
    eng = StreamingEngine(paths, out, cfg, epoch_files=EPOCH_FILES)
    assert eng.run(kill_after_epoch=3)["killed_after"] == 3
    res = eng.prune_state()
    assert res["chain_base_epoch"] == 2  # fulls at 0 and 2
    assert res["pruned"] == [0, 1]
    import os as _os

    assert not _os.path.isdir(f"{out}/_state/epoch=1")
    StreamingEngine(paths, out, cfg, epoch_files=EPOCH_FILES).run()
    _check_outputs(out, golden)


def test_streaming_dedup_ttl_bounded_state(tmp_path):
    """TTL mode: a text unseen for dedup_ttl_us of event time is forgotten
    and re-emits; output matches the oracle's per-epoch horizon replay, a
    killed run resumes identically (ts high marks reconstructed from the
    delta chain), and re-emissions actually occur (> exact-mode winners)."""
    from dataclasses import replace

    import pyarrow as pa

    table = generate_transcripts(n_convs=50, mean_turns=10, seed=23, late_frac=0.05)
    texts = [f"dup text {i % 20} payload" for i in range(len(table))]
    table = table.set_column(
        table.schema.get_field_index("text"), "text", pa.array(texts))
    cfg = replace(CFG, dedup_ttl_us=60_000_000, snapshot_full_every=3)
    d = tmp_path / "ttl_in"
    paths = write_transcripts(table, str(d), num_files=NUM_FILES, split_by="ts")
    golden = streaming_oracle(table, NUM_FILES, EPOCH_FILES, cfg)
    exact = streaming_oracle(table, NUM_FILES, EPOCH_FILES, CFG)
    assert len(golden["dedup"]) > len(exact["dedup"])  # horizon re-emissions
    out = str(tmp_path / "ttl_out")
    eng = StreamingEngine(paths, out, cfg, epoch_files=EPOCH_FILES)
    assert eng.run(kill_after_epoch=2)["killed_after"] == 2
    StreamingEngine(paths, out, cfg, epoch_files=EPOCH_FILES).run()
    assert_stream_equal(read_stream(out, "dedup"), golden["dedup"],
                        ["conv_id", "turn_idx"])


def test_dedup_ttl_below_lateness_rejected():
    from dataclasses import replace

    with pytest.raises(ValueError, match="dedup_ttl_us"):
        replace(CFG, dedup_ttl_us=CFG.lateness_us - 1)


def test_streaming_predicated_cep_and_resume(fixture, tmp_path):
    """Predicated CEP stream ("cepp"): per-slot Term predicates evaluated at
    route time (text never enters state), golden equality vs the
    single-process oracle, strictly fewer matches than the plain role
    funnel, and kill/resume emits the identical stream exactly once."""
    from dataclasses import replace

    from pdf_watermark_remover_ray.oracle import streaming_oracle
    from pdf_watermark_remover_ray.stages.cep import Term

    table, paths, _ = fixture
    cfg = replace(CFG, cep_terms=(
        Term(role="user", text_regex=r"\bstream\b"),
        Term(role="tool", tool="search"),
        Term(role="assistant"),
    ))
    golden = streaming_oracle(table, NUM_FILES, EPOCH_FILES, cfg)
    assert golden["cepp"] is not None and len(golden["cepp"]) > 0, \
        "fixture must exercise the predicated CEP path"
    assert len(golden["cepp"]) < len(golden["cep"])  # predicates prune

    out = str(tmp_path / "out_cepp")
    res = StreamingEngine(paths, out, cfg, epoch_files=EPOCH_FILES).run()
    assert res["all_succeeded"] is True
    assert_stream_equal(read_stream(out, "cepp"), golden["cepp"],
                        ["conv_id", "turn_idx", "dt_us"])
    # the other streams are untouched by the extra predicate stream
    assert_stream_equal(read_stream(out, "cep"), golden["cep"],
                        ["conv_id", "turn_idx", "dt_us"])

    out2 = str(tmp_path / "out_cepp_resume")
    StreamingEngine(paths, out2, cfg, epoch_files=EPOCH_FILES) \
        .run(kill_after_epoch=1)
    res2 = StreamingEngine(paths, out2, cfg, epoch_files=EPOCH_FILES).run()
    assert res2["all_succeeded"] is True
    assert_stream_equal(read_stream(out2, "cepp"), golden["cepp"],
                        ["conv_id", "turn_idx", "dt_us"])


def test_chaos_chain_with_cepp_and_cross_epoch_compaction(fixture, tmp_path):
    """Chaos chain over the FULL feature set: predicated CEP stream enabled,
    kill after every epoch, and a cross-epoch compaction of every stream
    between two resumes — final outputs (including cepp) must still equal
    the golden run exactly."""
    from dataclasses import replace

    from pdf_watermark_remover_ray.oracle import streaming_oracle
    from pdf_watermark_remover_ray.sinks.parquet import STREAMS, EpochSink
    from pdf_watermark_remover_ray.stages.cep import Term

    table, paths, _ = fixture
    cfg = replace(CFG, cep_terms=(
        Term(role="user", text_regex=r"\bstream\b"),
        Term(role="tool", tool="search"),
        Term(role="assistant"),
    ))
    golden = streaming_oracle(table, NUM_FILES, EPOCH_FILES, cfg)
    out = str(tmp_path / "out_chaos_cepp")
    n = StreamingEngine(paths, out, cfg, epoch_files=EPOCH_FILES).n_input_epochs
    sink = EpochSink(out)
    for e in range(n + 1):
        StreamingEngine(paths, out, cfg, epoch_files=EPOCH_FILES).run(
            kill_mid_epoch=e if e < n else None,
            kill_after_epoch=e)
        if e == 1:  # mid-chain: re-layout every committed stream
            for stream in STREAMS:
                sink.compact_stream(stream, target_bytes=1 << 30)
    StreamingEngine(paths, out, cfg, epoch_files=EPOCH_FILES).run()
    _check_outputs(out, golden)
    assert_stream_equal(read_stream(out, "cepp"), golden["cepp"],
                        ["conv_id", "turn_idx", "dt_us"])


def _never_quiet_fixture(tmp_path) -> tuple[list[str], int]:
    """Base stream + a planted NEVER-QUIET hot conversation: 400 turns at
    50 ms spacing (total span 20 s < every gap/horizon), alternating
    user/tool — its session never closes and, uncapped, its join/CEP
    buffers hold every one of its turns at once near stream end."""
    import pyarrow as pa

    base = generate_transcripts(n_convs=24, mean_turns=8, seed=31)
    bdf = base.to_pandas()
    n = 400
    start = int(bdf["arrival_us"].median())
    ts = start + np.arange(n, dtype=np.int64) * 50_000
    roles = np.where(np.arange(n) % 2 == 0, "user", "tool").astype(object)
    hot = pd.DataFrame({
        "conv_id": np.full(n, "chot", dtype=object),
        "turn_idx": np.arange(n, dtype=np.int32),
        "role": roles,
        "text": np.array([f"hot turn {i}" for i in range(n)], dtype=object),
        "tool": np.where(roles == "tool", "search", "").astype(object),
        "ts": pd.to_datetime(ts, unit="us"),
        "arrival_us": ts,
    })
    table = pa.Table.from_pandas(
        pd.concat([bdf, hot], ignore_index=True), preserve_index=False
    ).cast(base.schema)
    d = tmp_path / "in_hot"
    d.mkdir()
    paths = write_transcripts(table, str(d), num_files=NUM_FILES, split_by="ts")
    return paths, n


def test_open_state_cap_bounds_hot_key(tmp_path):
    """VERDICT r3 #7: per-key open-state bound.  A never-quiet hot conv
    (a) grows raw-row state without limit uncapped, (b) stays bounded at
    max_open_rows_per_key with force-dropped rows accounted exactly once
    in committed markers, and (c) a restored partition reconstructs the
    SAME capped state (per-key counts <= cap after a delta-chain restore)."""
    from dataclasses import replace

    from pdf_watermark_remover_ray.sinks.parquet import EpochSink
    from pdf_watermark_remover_ray.state.store import SortedStateStore

    paths, n_hot = _never_quiet_fixture(tmp_path)
    CAP = 40

    out0 = str(tmp_path / "out_nocap")
    res0 = StreamingEngine(paths, out0, CFG, epoch_files=EPOCH_FILES).run()
    peak0 = max(p["state_rows"] for m in res0["epochs"] for p in m["partitions"])
    assert all(p["capped_rows"] == 0
               for m in res0["epochs"] for p in m["partitions"])

    cfg = replace(CFG, max_open_rows_per_key=CAP)
    out1 = str(tmp_path / "out_cap")
    res1 = StreamingEngine(paths, out1, cfg, epoch_files=EPOCH_FILES).run()
    total_capped = sum(p["capped_rows"]
                       for m in res1["epochs"] for p in m["partitions"])
    assert total_capped > 0, "hot conv must trip the cap"
    peak1 = max(p["state_rows"] for m in res1["epochs"] for p in m["partitions"])
    assert peak1 < peak0, (peak1, peak0)

    # the state a RESUMED actor would hold is per-key bounded
    last = max(m["epoch"] for m in res1["epochs"])
    sink = EpochSink(out1)
    for pid in range(cfg.num_partitions):
        store = SortedStateStore.restore_chain(
            lambda e: sink.state_path(e, pid), last, cfg.join_gap_us,
            dedup_ttl_us=cfg.dedup_ttl_us, cep_within_us=cfg.cep_within_us,
            max_open_rows_per_key=CAP)
        for kind in ("users", "tools", "cepbuf"):
            df = store.get(kind)
            if len(df):
                assert df.groupby("conv_id").size().max() <= CAP, kind

    # exactly-once under kill/resume WITH the cap: identical output streams
    # and identical total capped accounting (markers commit once)
    out2 = str(tmp_path / "out_cap_resume")
    StreamingEngine(paths, out2, cfg, epoch_files=EPOCH_FILES).run(
        kill_after_epoch=1)
    res2 = StreamingEngine(paths, out2, cfg, epoch_files=EPOCH_FILES).run()
    assert res2["epochs"][0]["epoch"] == 2
    for stream, cols in (
            ("turns", ["conv_id", "turn_idx", "role", "modified"]),
            ("sessions", ["conv_id", "session_start_us", "session_end_us",
                          "n_turns"]),
            ("matches", ["conv_id", "user_turn_idx", "tool_turn_idx", "tool",
                         "dt_us"]),
            ("cep", ["conv_id", "turn_idx", "dt_us"]),
            ("windows", ["conv_id", "window_start_us", "n_turns"])):
        assert_stream_equal(read_stream(out2, stream),
                            read_stream(out1, stream), cols)
    cap2 = [p["capped_rows"] for e in (0, 1)
            for p in EpochSink(out2).read_marker(e)["partitions"]]
    cap1 = [p["capped_rows"] for e in (0, 1)
            for p in EpochSink(out1).read_marker(e)["partitions"]]
    assert cap2 == cap1


def test_emit_streams_gating(fixture, tmp_path):
    """Per-stream enablement: with emit_streams set, only the named streams
    (plus core turns/late) fold, emit and write — and what IS emitted is
    byte-identical to the all-on golden."""
    from dataclasses import replace

    table, paths, golden = fixture
    cfg = replace(CFG, emit_streams=("sessions", "windows", "wstats"))
    out = str(tmp_path / "out_gated")
    res = StreamingEngine(paths, out, cfg, epoch_files=EPOCH_FILES).run()

    assert_stream_equal(read_stream(out, "turns"), golden["turns"],
                        ["conv_id", "turn_idx", "role", "text", "modified"])
    assert_stream_equal(read_stream(out, "sessions"), golden["sessions"],
                        ["conv_id", "session_start_us", "session_end_us",
                         "n_turns"])
    assert_stream_equal(read_stream(out, "windows"), golden["windows"],
                        ["conv_id", "window_start_us", "n_turns"])
    for off in ("matches", "sliding", "dedup", "cep", "cepk", "timeouts",
                "wdistinct", "wtopk"):
        assert len(read_stream(out, off)) == 0, off
    for m in res["epochs"]:
        for p in m["partitions"]:
            assert set(p["emitted"]) <= {"sessions", "windows", "wstats"}, p

    # disabled kinds never enter state (snapshots stay lean)
    from pdf_watermark_remover_ray.sinks.parquet import EpochSink
    from pdf_watermark_remover_ray.state.store import SortedStateStore

    last = max(m["epoch"] for m in res["epochs"])
    sink = EpochSink(out)
    for pid in range(cfg.num_partitions):
        store = SortedStateStore.restore_chain(
            lambda e: sink.state_path(e, pid), last, cfg.join_gap_us,
            dedup_ttl_us=cfg.dedup_ttl_us, cep_within_us=cfg.cep_within_us)
        for kind in ("users", "tools", "cepbuf", "seen", "sliding", "wtools",
                     "pend", "arep"):
            assert len(store.get(kind)) == 0, kind

    with pytest.raises(ValueError):
        replace(CFG, emit_streams=("sessions", "nosuch"))


def test_enrich_stream_matches_oracle_and_survives_kill(fixture, tmp_path):
    """Stream-table broadcast join (``enrich`` output stream): tool turns
    decorated with the static dim at route time, exactly-once — the
    kill/resume run must emit the identical enriched rows."""
    table, paths, golden = fixture
    cfg = StreamConfig(
        num_partitions=4, lateness_us=15_000_000,
        session_gap_us=30_000_000, join_gap_us=30_000_000,
        tumbling_us=60_000_000, scrub=ScrubConfig(), enrich_stream=True)
    cols = ["conv_id", "turn_idx", "tool", "tool_group", "tool_weight"]

    out = str(tmp_path / "out_enrich")
    StreamingEngine(paths, out, cfg, epoch_files=EPOCH_FILES).run()
    got = read_stream(out, "enrich")
    assert_stream_equal(got, golden["enrich"], cols)
    # dim semantics: hits carry the dim constants; misses keep left-join
    # fallback ('unknown', 0.0) — both paths must appear in the fixture
    dim = dict((d[0], (d[1], d[2])) for d in cfg.enrich_dim)
    hits = got[got["tool"].isin(dim.keys())]
    misses = got[~got["tool"].isin(dim.keys())]
    assert len(hits) and len(misses)  # fixture exercises both join paths
    for t, (g, w) in dim.items():
        sub = got[got["tool"] == t]
        assert (sub["tool_group"] == g).all()
        assert (sub["tool_weight"] == w).all()
    assert (misses["tool_group"] == "unknown").all()
    assert (misses["tool_weight"] == 0.0).all()

    out2 = str(tmp_path / "out_enrich_kill")
    eng = StreamingEngine(paths, out2, cfg, epoch_files=EPOCH_FILES)
    res = eng.run(kill_after_epoch=1)
    assert res["killed_after"] == 1
    StreamingEngine(paths, out2, cfg, epoch_files=EPOCH_FILES).run()
    assert_stream_equal(read_stream(out2, "enrich"), golden["enrich"], cols)


def test_additive_schema_evolution_tolerated(fixture, tmp_path):
    """An input file carrying EXTRA columns (additive schema evolution —
    the only evolution a streaming source can tolerate without a policy)
    must stream through untouched: the route path projects the canonical
    columns and outputs stay golden-identical."""
    import pyarrow as pa

    table, paths, golden = fixture
    d = tmp_path / "evo_in"
    evo_paths = write_transcripts(table, str(d), num_files=NUM_FILES,
                                  split_by="ts")
    t2 = pq.read_table(evo_paths[2])
    t2 = t2.append_column("meta", pa.array(["v2"] * t2.num_rows))
    pq.write_table(t2, evo_paths[2])
    out = str(tmp_path / "evo_out")
    res = StreamingEngine(evo_paths, out, CFG, epoch_files=EPOCH_FILES).run()
    assert res["all_succeeded"]
    _check_outputs(out, golden)
