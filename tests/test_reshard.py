"""Elastic rescale: resume a checkpoint into a DIFFERENT partition count
(state re-split by the new routing, atomic layout commit) and still emit
exactly the single-process oracle's rows — plus the layout guard that
refuses an un-resharded mismatched resume."""

from __future__ import annotations

from dataclasses import replace

import pytest

from pdf_watermark_remover_ray.config import StreamConfig
from pdf_watermark_remover_ray.pipelines.streaming import StreamingEngine
from pdf_watermark_remover_ray.state.reshard import (read_layout,
                                                     reshard_checkpoint)

from test_streaming import CFG, EPOCH_FILES, _check_outputs, fixture  # noqa: F401


@pytest.mark.parametrize("new_p", [8, 2], ids=["grow-4to8", "shrink-4to2"])
def test_rescale_resume_exactly_once(fixture, tmp_path, new_p):  # noqa: F811
    table, paths, golden = fixture
    out = str(tmp_path / "out")
    eng = StreamingEngine(paths, out, CFG, epoch_files=EPOCH_FILES)
    res = eng.run(kill_after_epoch=1)
    assert res["killed_after"] == 1

    new_cfg = replace(CFG, num_partitions=new_p)
    summary = reshard_checkpoint(out, CFG, new_cfg)
    assert summary["epoch"] == 1
    assert summary["new_total"] == new_p
    assert sum(summary["rows_moved"].values()) > 0  # state actually moved

    eng2 = StreamingEngine(paths, out, new_cfg, epoch_files=EPOCH_FILES)
    res2 = eng2.run()
    assert res2["epochs"][0]["epoch"] == 2
    _check_outputs(out, golden)


def test_mismatched_resume_refused(fixture, tmp_path):  # noqa: F811
    table, paths, golden = fixture
    out = str(tmp_path / "out")
    StreamingEngine(paths, out, CFG, epoch_files=EPOCH_FILES) \
        .run(kill_after_epoch=1)
    with pytest.raises(ValueError, match="reshard"):
        StreamingEngine(paths, out, replace(CFG, num_partitions=8),
                        epoch_files=EPOCH_FILES)


def test_reshard_then_second_rescale_and_kill(fixture, tmp_path):  # noqa: F811
    """Two consecutive rescales with a kill between them: the layout's
    latest reshard epoch must anchor every later delta-chain walk."""
    table, paths, golden = fixture
    out = str(tmp_path / "out")
    StreamingEngine(paths, out, CFG, epoch_files=EPOCH_FILES) \
        .run(kill_after_epoch=1)
    cfg8 = replace(CFG, num_partitions=8)
    reshard_checkpoint(out, CFG, cfg8)
    res = StreamingEngine(paths, out, cfg8, epoch_files=EPOCH_FILES) \
        .run(kill_after_epoch=3)
    assert res["killed_after"] == 3
    cfg2 = replace(CFG, num_partitions=2)
    reshard_checkpoint(out, cfg8, cfg2)
    layout = read_layout(out)
    assert layout["num_partitions"] == 2
    assert layout["reshard"]["epoch"] == 3
    StreamingEngine(paths, out, cfg2, epoch_files=EPOCH_FILES).run()
    _check_outputs(out, golden)


def test_reshard_requires_matching_old_cfg(fixture, tmp_path):  # noqa: F811
    table, paths, golden = fixture
    out = str(tmp_path / "out")
    StreamingEngine(paths, out, CFG, epoch_files=EPOCH_FILES) \
        .run(kill_after_epoch=1)
    with pytest.raises(ValueError, match="does not match"):
        reshard_checkpoint(out, replace(CFG, num_partitions=7),
                           replace(CFG, num_partitions=8))


def test_cli_reshard_then_resume_with_wquant(fixture, tmp_path):  # noqa: F811
    """End-to-end through jobs/run_stream.py: library run killed after one
    epoch (wquant on), CLI --reshard-from to a new partition count, CLI
    resume with the new count — every stream incl. wquant matches the
    single-process oracle."""
    import json as _json
    import os
    import subprocess
    import sys

    from pdf_watermark_remover_ray.oracle import streaming_oracle
    from test_streaming import NUM_FILES, assert_stream_equal, read_stream

    table, paths, _ = fixture
    wcfg = replace(CFG, wquant_ps=(50, 95))
    golden = streaming_oracle(table, NUM_FILES, EPOCH_FILES, wcfg)
    out = str(tmp_path / "out")
    eng = StreamingEngine(paths, out, wcfg, epoch_files=EPOCH_FILES)
    assert eng.run(kill_after_epoch=1)["killed_after"] == 1

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, RAY_ADDRESS="local",
               PYTHONPATH=repo + os.pathsep + os.environ.get("PYTHONPATH", ""))
    indir = os.path.dirname(paths[0])
    common = [sys.executable, os.path.join(repo, "jobs", "run_stream.py"),
              "--input", f"{indir}/*.parquet", "--out", out,
              "--epoch-files", str(EPOCH_FILES),
              "--lateness-us", str(CFG.lateness_us),
              "--session-gap-us", str(CFG.session_gap_us),
              "--join-gap-us", str(CFG.join_gap_us),
              "--tumbling-us", str(CFG.tumbling_us)]
    r1 = subprocess.run(common + ["--reshard-from", "4", "--partitions", "8"],
                        env=env, capture_output=True, text=True, timeout=300)
    assert r1.returncode == 0, r1.stderr[-2000:]
    summary = _json.loads(r1.stdout.strip().splitlines()[-1])
    assert summary["new_total"] == 8
    r2 = subprocess.run(common + ["--partitions", "8",
                                  "--wquant-ps", "50,95"],
                        env=env, capture_output=True, text=True, timeout=300)
    assert r2.returncode == 0, r2.stderr[-2000:]
    assert_stream_equal(
        read_stream(out, "wquant"), golden["wquant"],
        ["conv_id", "window_start_us", "n_turns", "p50_chars", "p95_chars"])
    assert_stream_equal(
        read_stream(out, "turns"), golden["turns"],
        ["conv_id", "turn_idx", "role", "text", "tool", "ts", "modified"])


def test_prune_state_is_reshard_aware(fixture, tmp_path):  # noqa: F811
    """GC resolves the chain base THROUGH the layout (a reshard's full
    snapshot anchors it), prunes pre-reshard epoch state, drops stale
    reshard dirs, and keeps the live one only while a chain needs it."""
    import glob
    import os

    table, paths, golden = fixture
    out = str(tmp_path / "out")
    StreamingEngine(paths, out, CFG, epoch_files=EPOCH_FILES) \
        .run(kill_after_epoch=1)
    cfg8 = replace(CFG, num_partitions=8)
    reshard_checkpoint(out, CFG, cfg8)
    eng = StreamingEngine(paths, out, cfg8, epoch_files=EPOCH_FILES)
    eng.run(kill_after_epoch=3)
    cfg2 = replace(CFG, num_partitions=2)
    reshard_checkpoint(out, cfg8, cfg2)
    eng2 = StreamingEngine(paths, out, cfg2, epoch_files=EPOCH_FILES)
    eng2.run()
    res = eng2.prune_state()
    rdirs = [os.path.basename(d)
             for d in glob.glob(f"{out}/_state/reshard-*")]
    live = read_layout(out)["reshard"]["dir"]
    assert all(d == live for d in rdirs)  # stale reshard-e1-* gone
    assert "reshard-e1-p8" in res["pruned"]
    # resume after GC is still a no-op with intact outputs
    res2 = StreamingEngine(paths, out, cfg2, epoch_files=EPOCH_FILES).run()
    assert res2.get("resumed_done") is True
    _check_outputs(out, golden)


def test_stream_set_change_mid_chain_refused(fixture, tmp_path):  # noqa: F811
    """emit_streams / wquant_ps are part of the checkpoint's meaning: a
    disabled stream's state kinds stay empty, so flipping one on mid-chain
    would emit from missing state — the layout guard refuses both."""
    table, paths, golden = fixture
    out = str(tmp_path / "out")
    StreamingEngine(paths, out, CFG, epoch_files=EPOCH_FILES) \
        .run(kill_after_epoch=1)
    with pytest.raises(ValueError, match="stream set"):
        StreamingEngine(paths, out, replace(CFG, wquant_ps=(50,)),
                        epoch_files=EPOCH_FILES)
    with pytest.raises(ValueError, match="stream set"):
        StreamingEngine(paths, out,
                        replace(CFG, emit_streams=("sessions",)),
                        epoch_files=EPOCH_FILES)
    # identical config still resumes
    StreamingEngine(paths, out, CFG, epoch_files=EPOCH_FILES).run()
    _check_outputs(out, golden)
