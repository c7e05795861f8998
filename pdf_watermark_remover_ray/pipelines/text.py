"""Text-analysis operators over the ``documents`` table.

Large-scale training-data-pipeline stages: token counting, quality scoring,
language-ID (marker-word heuristic), document fingerprinting.  All are
actor-pool ``map_batches`` stages — patterns/stopword sets are compiled once
per actor in ``__init__`` (the reference's construct-once processor seam,
``main/remove_watermark.py:53``), work is vectorized pandas per batch.

Every operator's semantics are deliberately SQL-expressible so the DuckDB
oracle can check them exactly (see pipelines/queries.py):
token = non-empty chunk of a ``\\s+`` split; ratios guarded against /0;
floats rounded to 6 decimals on both sides.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

import ray.data

from ..functions.rounding import round_half_away

STOPWORDS = ("the", "and", "of", "a", "to", "in")

LANG_MARKERS = {
    "en": ("the", "and", "of"),
    "de": ("der", "und", "die"),
    "fr": ("le", "la", "et"),
    "es": ("el", "y", "los"),
}
LANG_ORDER = ("en", "de", "fr", "es")


def _token_lists(s: pd.Series) -> pd.Series:
    return s.fillna("").str.split()


class TextAnalyzer:
    """Stateful batch stage: token stats + quality + language-ID."""

    def __init__(self) -> None:
        self.stop = set(STOPWORDS)
        self.markers = {k: set(v) for k, v in LANG_MARKERS.items()}

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        text = batch["text"].fillna("")
        toks = _token_lists(text)
        n_tokens = toks.str.len().astype(np.int64)
        n_chars = text.str.len().astype(np.int64)
        n_alpha = text.str.count(r"[A-Za-z]").astype(np.int64)

        exploded = toks.explode()
        idx = exploded.index
        stop_hits = pd.Series(exploded.isin(self.stop).astype(np.int64), index=idx) \
            .groupby(level=0).sum().reindex(batch.index, fill_value=0)

        lang_counts = {}
        for lang in LANG_ORDER:
            hits = pd.Series(exploded.isin(self.markers[lang]).astype(np.int64), index=idx) \
                .groupby(level=0).sum().reindex(batch.index, fill_value=0)
            lang_counts[lang] = hits.to_numpy()

        counts = np.stack([lang_counts[lang] for lang in LANG_ORDER])  # (4, n)
        best = counts.max(axis=0)
        # first language (in LANG_ORDER) achieving the max, 'und' if all zero
        pred = np.full(len(batch), "und", dtype=object)
        taken = np.zeros(len(batch), dtype=bool)
        for i, lang in enumerate(LANG_ORDER):
            win = (~taken) & (counts[i] == best) & (best > 0)
            pred[win] = lang
            taken |= win

        alpha_ratio = np.where(n_chars > 0, n_alpha / n_chars.replace(0, 1), 0.0).astype(float)
        stop_ratio = np.where(n_tokens > 0, stop_hits / n_tokens.replace(0, 1), 0.0).astype(float)
        # quality from the UNROUNDED ratios: rounding first would park the
        # composite exactly on a .5e-7 boundary where numpy (half-even) and
        # DuckDB (half-away) round differently.
        quality = 0.5 * alpha_ratio + 0.5 * (1.0 - stop_ratio)
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"].to_numpy(),
                "n_chars": n_chars.to_numpy(),
                "n_tokens": n_tokens.to_numpy(),
                "alpha_ratio": round_half_away(alpha_ratio, 6),
                "stop_ratio": round_half_away(stop_ratio, 6),
                "lang_pred": pred,
                "quality_score": round_half_away(quality, 6),
            }
        )


def text_stats(sf_dir: str, concurrency: int = 2):
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ds.map_batches(TextAnalyzer, batch_format="pandas", batch_size=4096,
                          concurrency=concurrency)


class Fingerprinter:
    """md5 content fingerprint + 64-bit k-gram min-hash (winnowing-style)
    sketch: min over all character-``window``-gram md5-prefix hashes.

    The k-gram hash is md5-based so the DuckDB oracle replays the sketch
    exactly (``('0x' || substring(md5(substring(text, i, 8)), 1, 16))``);
    k-grams are factorized per batch so md5 runs once per UNIQUE gram, and
    the per-document min is one segmented ``np.minimum.reduceat``."""

    def __init__(self, window: int = 8) -> None:
        self.window = window

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        from ..functions.hashing import md5_u64

        text = batch["text"].fillna("")
        md5 = text.map(lambda s: hashlib.md5(s.encode("utf-8")).hexdigest())
        w = self.window
        grams: list[str] = []
        counts = np.zeros(len(text), dtype=np.int64)
        for pos, s in enumerate(text):
            n = max(len(s) - w + 1, 0)
            counts[pos] = n
            grams.extend(s[i:i + w] for i in range(n))
        out = np.zeros(len(text), dtype=np.uint64)
        nz = np.flatnonzero(counts)
        if len(nz):
            codes, uniq = pd.factorize(np.asarray(grams, dtype=object))
            hv = md5_u64(np.asarray(uniq, dtype=object))[codes]
            seg = np.concatenate([[0], np.cumsum(counts[nz])[:-1]])
            out[nz] = np.minimum.reduceat(hv, seg)
        return pd.DataFrame(
            {"doc_id": batch["doc_id"].to_numpy(), "fingerprint": md5.to_numpy(),
             "winnow64": out.view(np.int64)}
        )


def fingerprints(sf_dir: str, concurrency: int = 2):
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ds.map_batches(Fingerprinter, batch_format="pandas", batch_size=4096,
                          concurrency=concurrency)


# ASCII-explicit so Python re and DuckDB RE2 agree exactly (\w is unicode in
# Python but ASCII in RE2 — never use it in an oracle-facing regex).
BPE_ISH_TOKEN = r"[A-Za-z0-9_]+|[^A-Za-z0-9_\s]"


def token_counts(sf_dir: str):
    """Token counting two ways (training-data-pipeline staple): whitespace
    tokens and BPE-ish regex tokens (word pieces + individual punctuation).
    Vectorized pandas str ops; exact DuckDB oracle in queries.oracle_sql."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])

    def counts(df: pd.DataFrame) -> pd.DataFrame:
        text = df["text"].fillna("")
        ws = text.str.split().str.len().astype(np.int64)
        bpe = text.str.count(BPE_ISH_TOKEN).astype(np.int64)
        return pd.DataFrame({"doc_id": df["doc_id"].to_numpy(),
                             "ws_tokens": ws.to_numpy(),
                             "bpe_tokens": bpe.to_numpy()})

    return ds.map_batches(counts, batch_format="pandas")
