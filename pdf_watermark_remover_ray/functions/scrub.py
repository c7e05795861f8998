"""The scrub kernel — the reference's core compute, re-expressed over Arrow.

Semantics mirror ``mechanisms/watermark_processor.py:67-155`` of the reference
(T1-T5 in SURVEY.md §2.2) exactly, applied to the ``text`` column of a
transcript / document table instead of PDF content-stream bytes.  The fixed
transform order T1→T2→T3→T4→T5 within one pass, first-match-only span surgery
(T3), cursor+10 multi-occurrence loop (T4) and single-block color removal (T5)
are all order- and occurrence-sensitive, so there is exactly ONE per-row
implementation (:func:`scrub_text`) shared by the distributed engine and the
pure-Python test oracle (SURVEY.md §7.4 "Span-surgery scrub determinism").

Distribution strategy: a vectorized ``pyarrow.compute.match_substring`` premask
selects only rows containing any anchor (reference's P5 pattern-presence
pre-checks, ``watermark_processor.py:67,72,81,112,138``); non-matching rows
pass through zero-copy.  The batch transform is a stateless task — patterns
are constructor config, mirroring the reference's per-run parameter record.
"""

from __future__ import annotations

from typing import Iterable

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..config import ScrubConfig

# T3 anchor (watermark_processor.py:79) and end markers (:85).
DATE_ANCHOR = "Document non tenu"
END_MARKERS = ("Tj", "ET", "TD", ")")

# T4 patterns (watermark_processor.py:104-109): literal space-separated-hex
# renderings of "Document non tenu" and three progressively shorter variants,
# matched as literal substrings of the payload.
HEX_PATTERNS = (
    "44 6f 63 75 6d 65 6e 74 20 6e 6f 6e 20 74 65 6e 75",  # "Document non tenu"
    "6f 63 75 6d 65 6e 74 20 6e 6f 6e 20 74 65 6e 75",      # "ocument non tenu"
    "44 6f 63 75 6d",                                       # "Docum"
    "6e 6f 6e 20 74 65 6e 75",                              # "non tenu"
)

# T5 color markers (watermark_processor.py:138).
COLOR_MARKERS = ("1 0 0 rg", "0.8 0 0 rg", "1 0 0 RG")


def scrub_text(text: str, name_pattern: str, footer_pattern: str) -> tuple[str, bool]:
    """Apply T1-T5 to one payload; returns (new_text, modified).

    Mirrors watermark_processor.py:55-155 step for step (on str, not bytes:
    transcripts are valid UTF-8 so the reference's dual bytes/text view
    collapses to one string view — SURVEY.md §1.3).
    """
    modified = False

    # T1 — exact-substring delete, all occurrences (:67-69).
    if name_pattern and name_pattern in text:
        text = text.replace(name_pattern, "")
        modified = True

    # T2 — footer delete, only when enabled (:72-73; "" disables).
    if footer_pattern and footer_pattern in text:
        text = text.replace(footer_pattern, "")
        modified = True

    # T3 — fuzzy span delete anchored at "Document non tenu" (:79-101):
    # first end marker after start+10; opening paren via rfind before
    # start+15; structure-preserving replacement with "()"; first match only.
    if DATE_ANCHOR in text:
        start_pos = text.find(DATE_ANCHOR)
        for marker in END_MARKERS:
            end_pos = text.find(marker, start_pos + 10)
            if end_pos > 0:
                open_paren = text.rfind("(", 0, start_pos + 15)
                if open_paren > 0:
                    section = text[open_paren : end_pos + len(marker)]
                    if "(" in section and ")" in section:
                        text = text.replace(section, "()")
                        modified = True
                        break

    # T4 — hex byte-pattern multi-occurrence delete (:104-135): for every
    # occurrence, look back ≤100 / forward ≤200 for a paren pair and collapse
    # it to "()"; cursor advances by 10 to avoid an endless loop.  The search
    # continues over the *mutated* text, as in the reference.
    for pattern in HEX_PATTERNS:
        if pattern in text:
            start_idx = 0
            while True:
                start_idx = text.find(pattern, start_idx)
                if start_idx == -1:
                    break
                open_idx = max(0, start_idx - 100)
                chunk = text[open_idx : start_idx + 200]
                open_paren_pos = chunk.rfind("(", 0, 100)
                if open_paren_pos >= 0:
                    close_paren_pos = chunk.find(")", open_paren_pos)
                    if close_paren_pos > open_paren_pos:
                        removal = chunk[open_paren_pos : close_paren_pos + 1]
                        text = text.replace(removal, "()")
                        modified = True
                start_idx += 10

    # T5 — color-marker block delete (:138-155): right-most marker position,
    # find "BT" from red_pos-50 and "ET" after red_pos, collapse the block.
    if any(m in text for m in COLOR_MARKERS):
        red_pos = max(text.find(m) for m in COLOR_MARKERS)
        if red_pos > 0:
            bt_pos = text.find("BT", red_pos - 50)
            et_pos = text.find("ET", red_pos)
            if bt_pos > 0 and et_pos > bt_pos:
                block = text[bt_pos : et_pos + 2]
                text = text.replace(block, "BT ET")
                modified = True

    return text, modified


def scrub_t345(text: str, has3: bool, has4: bool, has5: bool) -> tuple[str, bool]:
    """T3–T5 only, for payloads whose T1/T2 replaces were already applied.

    Equivalent to :func:`scrub_text` on such payloads because T1/T2 are
    replace-all-occurrences (idempotent — a second pass is the identity) and
    the ``has*`` flags are computed on the post-T1/T2 text: a flag may only
    be False when that family's literal anchor is absent, in which case the
    family cannot fire.  Later steps cannot *create* an earlier family's
    anchor either — every mutation T3/T4 makes replaces some ``(…)`` span with
    ``"()"``, so any string spanning the splice point contains a paren, and
    no anchor (DATE_ANCHOR / hex patterns / color markers) contains one.
    All of the kernel's internal presence checks are kept, so the flags are
    pure skip-gates.  Shares its structure with :func:`scrub_text` T3–T5
    verbatim (watermark_processor.py:79-155).
    """
    modified = False

    if has3 and DATE_ANCHOR in text:
        start_pos = text.find(DATE_ANCHOR)
        for marker in END_MARKERS:
            end_pos = text.find(marker, start_pos + 10)
            if end_pos > 0:
                open_paren = text.rfind("(", 0, start_pos + 15)
                if open_paren > 0:
                    section = text[open_paren : end_pos + len(marker)]
                    if "(" in section and ")" in section:
                        text = text.replace(section, "()")
                        modified = True
                        break

    if has4:
        for pattern in HEX_PATTERNS:
            if pattern in text:
                start_idx = 0
                while True:
                    start_idx = text.find(pattern, start_idx)
                    if start_idx == -1:
                        break
                    open_idx = max(0, start_idx - 100)
                    chunk = text[open_idx : start_idx + 200]
                    open_paren_pos = chunk.rfind("(", 0, 100)
                    if open_paren_pos >= 0:
                        close_paren_pos = chunk.find(")", open_paren_pos)
                        if close_paren_pos > open_paren_pos:
                            removal = chunk[open_paren_pos : close_paren_pos + 1]
                            text = text.replace(removal, "()")
                            modified = True
                    start_idx += 10

    if has5:
        red_pos = max(text.find(m) for m in COLOR_MARKERS)
        if red_pos > 0:
            bt_pos = text.find("BT", red_pos - 50)
            et_pos = text.find("ET", red_pos)
            if bt_pos > 0 and et_pos > bt_pos:
                block = text[bt_pos : et_pos + 2]
                text = text.replace(block, "BT ET")
                modified = True

    return text, modified


def _anchor_patterns(cfg: ScrubConfig) -> list[str]:
    pats = [DATE_ANCHOR, *HEX_PATTERNS, *COLOR_MARKERS]
    if cfg.name_pattern:
        pats.append(cfg.name_pattern)
    if cfg.effective_footer:
        pats.append(cfg.effective_footer)
    return pats


def make_scrub_batch_fn(cfg: ScrubConfig, text_col: str = "text"):
    """Build the ``map_batches`` transform (Arrow in / Arrow out).

    A vectorized any-anchor premask selects candidate rows; only those pass
    through the per-row kernel.  On pattern-free data the batch is returned
    with a zero-copy ``modified`` column of falses.  Appends a bool
    ``modified`` column (reference's per-page ``modified`` flag / conditional
    write-back T6, watermark_processor.py:55,157-159).
    """
    import re

    patterns = _anchor_patterns(cfg)
    # ONE vectorized pass: alternation regex instead of N substring scans.
    anchor_re = "|".join(re.escape(p) for p in patterns)
    name, footer = cfg.name_pattern, cfg.effective_footer

    t3_re = re.escape(DATE_ANCHOR)
    t4_re = "|".join(re.escape(p) for p in HEX_PATTERNS)
    t5_re = "|".join(re.escape(p) for p in COLOR_MARKERS)

    def _present(arr: pa.Array, regex: str) -> np.ndarray:
        return pc.fill_null(pc.match_substring_regex(arr, regex), False) \
            .to_numpy(zero_copy_only=False)

    def scrub_batch(batch: pa.Table) -> pa.Table:
        col = batch[text_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        col = col.cast(pa.string())
        mask_np = _present(col, anchor_re)
        modified = np.zeros(len(batch), dtype=bool)
        if not mask_np.any():
            return batch.append_column("modified", pa.array(modified))
        # T1/T2 for ALL masked rows in one vectorized replace chain (the
        # reference applies them first and replace-all is idempotent, so the
        # per-row kernel below can skip them entirely).
        mask_arr = pa.array(mask_np)
        sub = col.filter(mask_arr)
        mods = np.flatnonzero(mask_np)
        sub_mod = np.zeros(len(mods), dtype=bool)
        # T1/T2 presence is detected by length change instead of a second
        # regex scan: the patterns are non-empty and the replacement is "",
        # so a row is modified iff the replace shortened it (~free next to
        # the replace itself; measured ≈1 regex scan saved per pattern).
        if name:
            before = pc.binary_length(sub)
            sub = pc.replace_substring(sub, pattern=name, replacement="")
            sub_mod |= pc.not_equal(pc.binary_length(sub), before) \
                .to_numpy(zero_copy_only=False)
        if footer:
            before = pc.binary_length(sub)
            sub = pc.replace_substring(sub, pattern=footer, replacement="")
            sub_mod |= pc.not_equal(pc.binary_length(sub), before) \
                .to_numpy(zero_copy_only=False)
        modified[mods] = sub_mod
        # T3/T4/T5 anchor masks on the POST-T1/T2 text (the reference checks
        # each step against the mutated payload, and a T1/T2 removal can
        # splice an anchor into existence), restricted to the masked subset.
        m3, m4, m5 = (_present(sub, r) for r in (t3_re, t4_re, t5_re))
        m345_sub = m3 | m4 | m5
        hits = np.flatnonzero(m345_sub)
        if len(hits):
            # The kernel is a pure function of the text (the has* flags are
            # presence masks of that same text), and watermarked payloads
            # repeat heavily in real corpora — dictionary-encode the hit rows
            # and run the per-row surgery once per DISTINCT payload, then map
            # results back through the codes (vectorized DictionaryArray).
            enc = pc.dictionary_encode(sub.take(pa.array(hits)))
            codes = enc.indices.to_numpy(zero_copy_only=False)
            uniq_vals = enc.dictionary.to_pylist()
            first = np.zeros(len(uniq_vals), dtype=np.int64)
            first[codes[::-1]] = np.arange(len(codes) - 1, -1, -1)
            mod_u = np.zeros(len(uniq_vals), dtype=bool)
            for u, v in enumerate(uniq_vals):
                i = hits[first[u]]
                new_text, mod = scrub_t345(v, m3[i], m4[i], m5[i])
                if mod:
                    uniq_vals[u] = new_text
                    mod_u[u] = True
            modified[mods[hits[mod_u[codes]]]] = True
            hit_arr = pa.DictionaryArray.from_arrays(
                pa.array(codes, pa.int32()), pa.array(uniq_vals, pa.string())
            ).cast(pa.string())
            # Splice the T3-T5 results back into the NARROW masked view, so
            # the full-width replace_with_mask below runs once, not twice.
            sub = pc.replace_with_mask(sub, pa.array(m345_sub), hit_arr)
        col = pc.replace_with_mask(col, mask_arr, sub)
        out = batch.set_column(
            batch.schema.get_field_index(text_col), text_col, col
        )
        return out.append_column("modified", pa.array(modified))

    return scrub_batch


def scrub_dataset(ds, cfg: ScrubConfig | None = None, text_col: str = "text"):
    """``ds.map_batches`` wrapper: scrub the ``text`` column, add ``modified``."""
    cfg = cfg or ScrubConfig()
    return ds.map_batches(
        make_scrub_batch_fn(cfg, text_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def oracle_scrub_rows(texts: Iterable[str | None], cfg: ScrubConfig) -> list[tuple[str | None, bool]]:
    """Pure-Python single-process oracle over an iterable of payloads.

    Shares :func:`scrub_text` with the engine so the golden comparison checks
    the *distribution*, not two divergent kernels (SURVEY.md §5.1).  Null /
    empty payloads pass through unmodified (reference P4 empty-stream skip,
    watermark_processor.py:60-61 — kept, not dropped).
    """
    footer = cfg.effective_footer
    out: list[tuple[str | None, bool]] = []
    for t in texts:
        if not t:
            out.append((t, False))
        else:
            out.append(scrub_text(t, cfg.name_pattern, footer))
    return out
