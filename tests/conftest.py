"""Session-scoped Ray fixture — ONE ray.init per pytest session."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    import ray

    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return "/root/testdata/sf0.001"


def duck_sql(sf_dir: str, sql: str, tables=("events", "orders", "documents")):
    """Run oracle SQL against the testdata views (shared test helper)."""
    import duckdb

    con = duckdb.connect()
    for t in tables:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")
    return con.sql(sql).df()


def assert_frames_match(ray_df, duck_df):
    """Order-insensitive frame equality: same columns, rows, values
    (floats via allclose) — the shared comparator for oracle tests."""
    import numpy as np

    cols = sorted(ray_df.columns)
    assert sorted(duck_df.columns) == cols, (sorted(duck_df.columns), cols)
    a = ray_df[cols].sort_values(cols).reset_index(drop=True)
    b = duck_df[cols].sort_values(cols).reset_index(drop=True)
    assert len(a) == len(b), (len(a), len(b))
    for c in cols:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            assert np.allclose(av.astype(float), bv.astype(float),
                               equal_nan=True), c
        else:
            assert (av.astype(str) == bv.astype(str)).all(), c


@pytest.fixture(scope="session")
def tiny_transcripts():
    """F1-tiny fixture table (deterministic, seed=42)."""
    from pdf_watermark_remover_ray.sources.transcripts import generate_transcripts

    return generate_transcripts(n_convs=20, mean_turns=8, seed=42)
