"""Windowed nearest-rank percentiles (wquant stream): golden equality vs
the single-process oracle, kill/resume exactly-once, and the cross-stream
invariant p100 == max_chars from the independent wstats fold."""

from __future__ import annotations

from dataclasses import replace

import pandas as pd
import pytest

from pdf_watermark_remover_ray.oracle import streaming_oracle
from pdf_watermark_remover_ray.pipelines.streaming import StreamingEngine

from test_streaming import (CFG, EPOCH_FILES, NUM_FILES, assert_stream_equal,
                            fixture, read_stream)  # noqa: F401

WCFG = replace(CFG, wquant_ps=(50, 95, 100))


@pytest.fixture(scope="module")
def wq_golden(fixture):  # noqa: F811
    table, paths, _ = fixture
    return streaming_oracle(table, NUM_FILES, EPOCH_FILES, WCFG)


WQ_COLS = ["conv_id", "window_start_us", "n_turns", "p50_chars", "p95_chars",
           "p100_chars"]


def test_wquant_full_run(fixture, wq_golden, tmp_path):  # noqa: F811
    table, paths, _ = fixture
    out = str(tmp_path / "out")
    StreamingEngine(paths, out, WCFG, epoch_files=EPOCH_FILES).run()
    got = read_stream(out, "wquant")
    assert len(wq_golden["wquant"]) > 0
    assert (wq_golden["wquant"]["p50_chars"]
            < wq_golden["wquant"]["p100_chars"]).any(), \
        "fixture must exercise non-degenerate percentile spreads"
    assert_stream_equal(got, wq_golden["wquant"], WQ_COLS)


def test_wquant_kill_resume(fixture, wq_golden, tmp_path):  # noqa: F811
    table, paths, _ = fixture
    out = str(tmp_path / "out")
    eng = StreamingEngine(paths, out, WCFG, epoch_files=EPOCH_FILES)
    assert eng.run(kill_after_epoch=2)["killed_after"] == 2
    StreamingEngine(paths, out, WCFG, epoch_files=EPOCH_FILES).run()
    assert_stream_equal(read_stream(out, "wquant"), wq_golden["wquant"],
                        WQ_COLS)


def test_wquant_p100_equals_wstats_max(fixture, wq_golden, tmp_path):  # noqa: F811
    """p100 (nearest-rank) must equal max_chars from the INDEPENDENT wstats
    state, window by window — a cross-fold consistency check."""
    table, paths, _ = fixture
    out = str(tmp_path / "out")
    StreamingEngine(paths, out, WCFG, epoch_files=EPOCH_FILES).run()
    wq = read_stream(out, "wquant")
    st = read_stream(out, "wstats")
    m = wq.merge(st, on=["conv_id", "window_start_us"])
    assert len(m) == len(wq) == len(st)
    assert (m["p100_chars"] == m["max_chars"]).all()
    assert (m["n_turns_x"] == m["n_turns_y"]).all()


def test_wquant_off_by_default(fixture, tmp_path):  # noqa: F811
    table, paths, _ = fixture
    out = str(tmp_path / "out")
    StreamingEngine(paths, out, CFG, epoch_files=EPOCH_FILES).run()
    assert read_stream(out, "wquant").empty  # no fold, no files


def test_wquant_ps_validation():
    with pytest.raises(ValueError, match="wquant_ps"):
        replace(CFG, wquant_ps=(0,))
    with pytest.raises(ValueError, match="wquant_ps"):
        replace(CFG, wquant_ps=(50.0,))
