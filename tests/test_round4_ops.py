"""Round-4 operators: TPC-H Q14/Q17/Q18/Q19 shapes, EXCEPT set op,
Bloom-filtered semijoin."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from pdf_watermark_remover_ray.pipelines import queries as Q

from conftest import assert_frames_match as _cmp
from conftest import duck_sql


@pytest.mark.parametrize("name,tables", [
    ("q14_promo_revenue", ("lineitem", "part")),
    ("q17_small_qty_revenue", ("lineitem", "part")),
    ("q18_large_orders", ("lineitem", "orders", "customer")),
    ("q19_disjunctive_revenue", ("lineitem", "part")),
    ("customers_without_events", ("orders", "events")),
    ("bloom_semijoin_revenue", ("lineitem", "supplier")),
])
def test_round4_relational_matches_sql(sf_dir, name, tables):
    got = Q.queries()[name](sf_dir)
    got = got.to_pandas() if hasattr(got, "to_pandas") else got
    want = duck_sql(sf_dir, Q.oracle_sql()[name], tables=tables)
    assert len(want) > 0  # every fixture exercises the operator
    _cmp(got, want)


def test_bloom_filter_properties():
    """No false negatives ever; false-positive rate small at design load;
    merge(OR) == build-on-union."""
    from pdf_watermark_remover_ray.functions.bloom import Bloom

    rng = np.random.default_rng(7)
    members = rng.choice(1 << 40, size=2000, replace=False).astype(np.int64)
    others = rng.choice(1 << 40, size=20000, replace=False).astype(np.int64)
    others = others[~np.isin(others, members)]
    b = Bloom(m_bits=1 << 16, k=4)
    b.add(members)
    assert b.contains(members).all()  # NO false negatives
    fp = b.contains(others).mean()
    assert fp < 0.02, fp  # ~2k keys in 64k bits, k=4 → well under 2%

    half1, half2 = members[:1000], members[1000:]
    b1 = Bloom(m_bits=1 << 16, k=4)
    b1.add(half1)
    b2 = Bloom(m_bits=1 << 16, k=4)
    b2.add(half2)
    assert (b1.merge(b2).bits == b.bits).all()  # mergeable partial


def test_bloom_semijoin_fp_killed_by_verify(sf_dir):
    """Degenerate bloom (every probe positive: m tiny) must STILL give the
    exact answer — the verify stage owns correctness, the bloom only prunes."""
    from pdf_watermark_remover_ray.pipelines.relational import (
        bloom_semijoin_oracle_sql, bloom_semijoin_revenue)

    got = bloom_semijoin_revenue(sf_dir, m_bits=8).to_pandas()  # all-FP bloom
    want = duck_sql(sf_dir, bloom_semijoin_oracle_sql(),
                    tables=("lineitem", "supplier"))
    _cmp(got, want)


def test_q18_threshold_selectivity(sf_dir):
    """The HAVING filter leaves a small broadcastable key set (the scale
    assumption the decorate stage relies on)."""
    import duckdb

    got = Q.queries()["q18_large_orders"](sf_dir)
    con = duckdb.connect()
    n_orders = con.sql(
        f"SELECT count(*) FROM read_parquet('{sf_dir}/orders.parquet')"
    ).fetchone()[0]
    con.close()
    assert 0 < len(got) < 0.15 * n_orders
