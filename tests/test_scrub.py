"""Scrub kernel (T1-T5) golden tests vs the pure-Python oracle."""

from __future__ import annotations

import pyarrow as pa

import ray.data

from pdf_watermark_remover_ray.config import ScrubConfig
from pdf_watermark_remover_ray.functions.scrub import (
    oracle_scrub_rows,
    scrub_dataset,
    scrub_text,
)

CFG = ScrubConfig()


def test_t1_name_all_occurrences():
    t, mod = scrub_text("a CONFIDENTIEL J.DUPONT b CONFIDENTIEL J.DUPONT", CFG.name_pattern, "")
    assert t == "a  b " and mod


def test_t2_footer_toggle():
    s = "x DOCUMENT NON APPLICABLE y"
    t_on, mod_on = scrub_text(s, "ZZZ", "DOCUMENT NON APPLICABLE")
    t_off, mod_off = scrub_text(s, "ZZZ", "")
    assert t_on == "x  y" and mod_on
    assert t_off == s and not mod_off


def test_t3_anchored_span():
    s = "pre (Document non tenu à jour au 2026-07-08) Tj post"
    t, mod = scrub_text(s, "ZZZ", "")
    assert mod and "Document non tenu" not in t
    assert t.startswith("pre (")  # structure-preserving "()" replacement


def test_t3_no_open_paren_left_intact_span():
    # Anchor present but no "(" before it within start+15 → rfind misses → no T3 fire,
    # but T4's "non tenu" hex pattern is absent (plain text), so only T3 applies.
    s = "x" * 40 + " Document non tenu Tj tail"
    t, mod = scrub_text(s, "ZZZ", "")
    assert not mod and t == s


def test_t4_hex_pattern_paren_chunk():
    s = "head (44 6f 63 75 6d payload) tail"
    t, mod = scrub_text(s, "ZZZ", "")
    assert mod and t == "head () tail"


def test_t4_no_paren_window_left_intact():
    s = "head 6e 6f 6e 20 74 65 6e 75 tail no parens"
    t, mod = scrub_text(s, "ZZZ", "")
    assert not mod and t == s


def test_t5_color_block():
    s = "pre BT 1 0 0 rg (WM) Tj ET post"
    t, mod = scrub_text(s, "ZZZ", "")
    assert mod and t == "pre BT ET post"


def test_scrub_dataset_matches_oracle(tiny_transcripts):
    ds = ray.data.from_arrow(tiny_transcripts)
    out = (
        scrub_dataset(ds, CFG)
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    golden = oracle_scrub_rows(tiny_transcripts["text"].to_pylist(), CFG)
    src = tiny_transcripts.to_pandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    golden_sorted = [
        golden[i] for i in tiny_transcripts.to_pandas().sort_values(["conv_id", "turn_idx"]).index
    ]
    assert list(out["text"].fillna("@null@")) == [
        (t if t is not None else "@null@") for t, _ in golden_sorted
    ]
    assert list(out["modified"]) == [m for _, m in golden_sorted]
    # at least one row per transform kind actually fired in the fixture
    assert out["modified"].sum() > 10
    # pass-through rows byte-identical
    assert (out.loc[~out["modified"], "text"].fillna("") ==
            src.loc[~out["modified"], "text"].fillna("")).all()
