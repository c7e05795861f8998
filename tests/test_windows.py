"""Window + join + watermark stages vs DuckDB oracles on the testdata tables."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest

from pdf_watermark_remover_ray.sources.transcripts import TRANSCRIPTS_CTE, derive_transcripts
from pdf_watermark_remover_ray.stages.join import stream_join
from pdf_watermark_remover_ray.stages.watermark import late_rows
from pdf_watermark_remover_ray.stages.windows import (
    session_windows,
    sliding_counts,
    tumbling_counts,
)

GAP_US = 1_800_000_000  # 30 min session gap fits the events cadence
SIZE_US = 3_600_000_000  # 1 h windows
SLIDE_US = 900_000_000  # 15 min slide


def _duck(sf_dir: str, sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf_dir}/events.parquet')"
    )
    return con.sql(sql).df()


def _cmp(ray_df: pd.DataFrame, duck_df: pd.DataFrame):
    cols = sorted(ray_df.columns)
    assert sorted(duck_df.columns) == cols, (sorted(duck_df.columns), cols)
    a = ray_df[cols].sort_values(cols).reset_index(drop=True)
    b = duck_df[cols].sort_values(cols).reset_index(drop=True)
    assert len(a) == len(b), (len(a), len(b))
    for c in cols:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            assert np.allclose(av.astype(float), bv.astype(float)), c
        else:
            assert (av.astype(str) == bv.astype(str)).all(), c


def test_derive_transcripts_matches_sql(sf_dir):
    ray_df = derive_transcripts(sf_dir, num_partitions=4).to_pandas()
    duck_df = _duck(
        sf_dir,
        f"WITH {TRANSCRIPTS_CTE} SELECT conv_id, turn_idx, role, text, tool, ts FROM transcripts",
    )
    ray_df["ts"] = ray_df["ts"].astype("datetime64[us]")
    duck_df["ts"] = duck_df["ts"].astype("datetime64[us]")
    _cmp(ray_df, duck_df)


def test_tumbling_counts_matches_sql(sf_dir):
    ds = derive_transcripts(sf_dir, num_partitions=4)
    ray_df = tumbling_counts(ds, SIZE_US).to_pandas()
    duck_df = _duck(
        sf_dir,
        f"""WITH {TRANSCRIPTS_CTE}
        SELECT conv_id, (epoch_us(ts) // {SIZE_US}) * {SIZE_US} AS window_start_us,
               count(*) AS n_turns
        FROM transcripts GROUP BY 1, 2""",
    )
    _cmp(ray_df, duck_df)


def test_sliding_counts_matches_sql(sf_dir):
    ds = derive_transcripts(sf_dir, num_partitions=4)
    ray_df = sliding_counts(ds, SIZE_US, SLIDE_US).to_pandas()
    n_off = SIZE_US // SLIDE_US
    duck_df = _duck(
        sf_dir,
        f"""WITH {TRANSCRIPTS_CTE}
        SELECT conv_id,
               ((epoch_us(ts) // {SLIDE_US}) - off) * {SLIDE_US} AS window_start_us,
               count(*) AS n_turns
        FROM transcripts, (SELECT unnest(generate_series(0, {n_off - 1})) AS off)
        WHERE ((epoch_us(ts) // {SLIDE_US}) - off) * {SLIDE_US} > epoch_us(ts) - {SIZE_US}
        GROUP BY 1, 2""",
    )
    _cmp(ray_df, duck_df)


def test_session_windows_matches_sql(sf_dir):
    ds = derive_transcripts(sf_dir, num_partitions=4)
    ray_df = session_windows(ds, GAP_US, num_partitions=4).to_pandas()
    duck_df = _duck(
        sf_dir,
        f"""WITH {TRANSCRIPTS_CTE},
        flagged AS (
            SELECT conv_id, epoch_us(ts) AS ts_us,
                   CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
                        OVER (PARTITION BY conv_id ORDER BY ts, turn_idx) > {GAP_US}
                        THEN 1 ELSE 0 END AS brk
            FROM transcripts),
        sess AS (
            SELECT conv_id, ts_us,
                   sum(brk) OVER (PARTITION BY conv_id ORDER BY ts_us
                                  ROWS UNBOUNDED PRECEDING) AS sid
            FROM flagged)
        SELECT conv_id, min(ts_us) AS session_start_us, max(ts_us) AS session_end_us,
               count(*) AS n_turns
        FROM sess GROUP BY conv_id, sid""",
    )
    _cmp(ray_df, duck_df)


def test_stream_join_matches_sql(sf_dir):
    ds = derive_transcripts(sf_dir, num_partitions=4)
    ray_df = stream_join(ds, GAP_US, num_partitions=4).to_pandas()
    duck_df = _duck(
        sf_dir,
        f"""WITH {TRANSCRIPTS_CTE}
        SELECT t.conv_id, u.turn_idx AS user_turn_idx, t.turn_idx AS tool_turn_idx,
               t.tool, epoch_us(t.ts) - epoch_us(u.ts) AS dt_us
        FROM (SELECT * FROM transcripts WHERE role = 'tool') t
        JOIN (SELECT * FROM transcripts WHERE role = 'user') u USING (conv_id)
        WHERE u.ts <= t.ts AND epoch_us(t.ts) - epoch_us(u.ts) <= {GAP_US}
        QUALIFY row_number() OVER (PARTITION BY t.conv_id, t.turn_idx
                                   ORDER BY u.ts DESC, u.turn_idx DESC) = 1""",
    )
    assert len(ray_df) > 0
    _cmp(ray_df, duck_df)


def test_late_rows_matches_sql(sf_dir):
    ds = derive_transcripts(sf_dir, num_partitions=4, keep_event_id=True)
    lateness_us = 12 * 3_600_000_000  # 12 h allowed lateness on a month-long stream
    epoch_size = 100
    block = 256
    ray_df = late_rows(ds, lateness_us, epoch_size, scramble_block=block).to_pandas()
    duck_df = _duck(
        sf_dir,
        f"""WITH {TRANSCRIPTS_CTE},
        e AS (SELECT *, CAST(((event_id // {block}) * {block}
                              + ({block} - 1 - event_id % {block})) // {epoch_size}
                        AS INT) AS epoch FROM transcripts),
        em AS (SELECT epoch, max(epoch_us(ts)) AS mx FROM e GROUP BY epoch),
        wm AS (SELECT epoch,
                      max(mx) OVER (ORDER BY epoch ROWS UNBOUNDED PRECEDING)
                      - {lateness_us} AS wm_after
               FROM em)
        SELECT e.conv_id, e.turn_idx, e.epoch
        FROM e JOIN wm ON wm.epoch = e.epoch - 1
        WHERE epoch_us(e.ts) < wm.wm_after""",
    )
    assert len(ray_df) > 0, "fixture should contain late rows at this lateness"
    _cmp(ray_df, duck_df)


def test_join_tiebreak_same_ts():
    """Two user turns at the SAME ts: the join must pick the larger turn_idx
    (merge_asof keeps the last in (ts, turn_idx) order — the documented
    tiebreak mirrored by the oracle's ORDER BY u.ts DESC, u.turn_idx DESC)."""
    import numpy as np
    import pandas as pd

    from pdf_watermark_remover_ray.stages.join import join_pdf

    df = pd.DataFrame({
        "conv_id": ["c"] * 3,
        "turn_idx": np.array([0, 1, 2], dtype=np.int32),
        "role": ["user", "user", "tool"],
        "tool": ["", "", "search"],
        "ts": pd.to_datetime([1_000_000, 1_000_000, 1_500_000], unit="us"),
    })
    out = join_pdf(df, gap_us=10_000_000)
    assert len(out) == 1
    assert out.iloc[0]["user_turn_idx"] == 1  # larger turn_idx wins the tie
    assert out.iloc[0]["dt_us"] == 500_000
