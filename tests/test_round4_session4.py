"""Round-4 session-4 operators: iterative PageRank over the bipartite
customer-supplier trade graph (the engine's join-free BSP iteration shape)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from pdf_watermark_remover_ray.pipelines import queries as Q

from conftest import assert_frames_match as _cmp
from conftest import duck_sql


def test_pagerank_matches_sql(sf_dir):
    got = Q.queries()["customer_supplier_pagerank"](sf_dir)
    got = got.to_pandas() if hasattr(got, "to_pandas") else got
    want = duck_sql(sf_dir, Q.oracle_sql()["customer_supplier_pagerank"],
                    tables=("lineitem", "orders"))
    assert len(want) > 0
    _cmp(got, want)


def test_pagerank_mass_conservation(sf_dir):
    """A symmetrized graph has no dangling nodes, so total rank mass is
    exactly 1 after any number of damped iterations (up to rounding)."""
    out = Q.queries()["customer_supplier_pagerank"](sf_dir)
    out = out.to_pandas() if hasattr(out, "to_pandas") else out
    assert out["node"].is_unique
    assert abs(out["rank"].sum() - 1.0) < 1e-6
    assert (out["rank"] > 0).all()
    # bipartite namespacing survived the int64 round-trip
    assert set(out["node"].str[:2].unique()) == {"c:", "s:"}
