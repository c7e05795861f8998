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
import pyarrow as pa

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
    """Stateful batch stage: token stats + quality + language-ID.

    Arrow-native hot path (round-4 verdict item 6): the batch stays a
    ``pa.Table``; tokenization is ``pc.utf8_split_whitespace`` (its empty
    boundary tokens masked out to match Python ``str.split()``), set
    membership is ``pc.is_in`` over the FLATTENED token array, and the
    per-document roll-ups are cumsum-diff segmented sums over the list
    offsets — the text column crosses zero pandas round-trips.  A pandas
    DataFrame input is still accepted (unit tests drive the class
    directly) and converted once."""

    def __init__(self) -> None:
        import pyarrow.compute as pc

        self.stop_arr = pa.array(sorted(STOPWORDS))
        self.lang_arrs = {k: pa.array(sorted(v))
                          for k, v in LANG_MARKERS.items()}
        self._pc = pc

    def __call__(self, batch) -> pa.Table:
        pc = self._pc
        t = pa.Table.from_pandas(batch, preserve_index=False) \
            if isinstance(batch, pd.DataFrame) else batch
        text = pc.fill_null(t["text"], "")
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        n_chars = pc.utf8_length(text).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        n_alpha = pc.count_substring_regex(text, "[A-Za-z]") \
            .to_numpy(zero_copy_only=False).astype(np.int64)

        toks = pc.utf8_split_whitespace(text)
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        ends = np.cumsum(lens)
        starts = ends - lens
        flat = toks.flatten()

        def seg_sum(hits: np.ndarray) -> np.ndarray:
            cs = np.concatenate([[0], np.cumsum(hits, dtype=np.int64)])
            return cs[ends] - cs[starts]

        nonempty = pc.greater(pc.utf8_length(flat), 0) \
            .to_numpy(zero_copy_only=False)
        n_tokens = seg_sum(nonempty)
        stop_hits = seg_sum(
            pc.is_in(flat, value_set=self.stop_arr)
            .to_numpy(zero_copy_only=False))
        counts = np.stack([
            seg_sum(pc.is_in(flat, value_set=self.lang_arrs[lang])
                    .to_numpy(zero_copy_only=False))
            for lang in LANG_ORDER])  # (4, n)

        best = counts.max(axis=0)
        # first language (in LANG_ORDER) achieving the max, 'und' if all zero
        pred = np.full(len(t), "und", dtype=object)
        taken = np.zeros(len(t), dtype=bool)
        for i, lang in enumerate(LANG_ORDER):
            win = (~taken) & (counts[i] == best) & (best > 0)
            pred[win] = lang
            taken |= win

        alpha_ratio = np.where(n_chars > 0, n_alpha / np.maximum(n_chars, 1), 0.0)
        stop_ratio = np.where(n_tokens > 0, stop_hits / np.maximum(n_tokens, 1), 0.0)
        # quality from the UNROUNDED ratios: rounding first would park the
        # composite exactly on a .5e-7 boundary where numpy (half-even) and
        # DuckDB (half-away) round differently.
        quality = 0.5 * alpha_ratio + 0.5 * (1.0 - stop_ratio)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_chars": pa.array(n_chars),
                "n_tokens": pa.array(n_tokens),
                "alpha_ratio": pa.array(round_half_away(alpha_ratio, 6)),
                "stop_ratio": pa.array(round_half_away(stop_ratio, 6)),
                "lang_pred": pa.array(pred, pa.string()),
                "quality_score": pa.array(round_half_away(quality, 6)),
            }
        )


def text_stats(sf_dir: str, concurrency: int = 2):
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ds.map_batches(TextAnalyzer, batch_format="pyarrow",
                          zero_copy_batch=True, batch_size=4096,
                          concurrency=concurrency)


class _LangConfusion:
    """Actor-pool stage for :func:`lang_confusion`: one TextAnalyzer per
    actor (stopword/marker sets built once), per-batch (lang, lang_pred)
    count partials."""

    def __init__(self) -> None:
        self.an = TextAnalyzer()

    def __call__(self, t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        out = self.an(t.select(["doc_id", "text"]))
        lang = pc.fill_null(t["lang"], "").to_pandas().to_numpy(object)
        pred = out["lang_pred"].to_numpy(zero_copy_only=False)
        g = pd.DataFrame({"lang": lang, "lang_pred": pred}) \
            .groupby(["lang", "lang_pred"], sort=False).size() \
            .reset_index(name="partial_n")
        return pa.Table.from_pandas(g, preserve_index=False)


def lang_confusion(sf_dir: str, concurrency: int = 2):
    """Language-ID CONFUSION MATRIX: documents counted by (declared lang,
    predicted lang) — the corpus-health diagnostic that tells you where the
    n-gram language heuristic (TextAnalyzer) disagrees with the metadata,
    i.e. which slices need a better classifier before lang-conditioned
    mixing.  The (lang × lang_pred) domain is fixed by the marker set, so
    per-batch partials fold on the driver via the shared streamed fold —
    no AllToAll; the heuristic itself is the SAME Arrow-native kernel
    text_stats runs, so the oracle replays it exactly."""
    from .relational import _merge_bounded_partials

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text", "lang"])
    out = _merge_bounded_partials(
        ds.map_batches(_LangConfusion, batch_format="pyarrow",
                       zero_copy_batch=True, batch_size=4096,
                       concurrency=concurrency),
        keys=["lang", "lang_pred"], sums={"partial_n": "n_docs"})
    if out is None:
        return pd.DataFrame({"lang": pd.Series([], dtype=object),
                             "lang_pred": pd.Series([], dtype=object),
                             "n_docs": pd.Series([], dtype=np.int64)})
    return out.sort_values(["lang", "lang_pred"]).reset_index(drop=True)


class Fingerprinter:
    """md5 content fingerprint + 64-bit k-gram min-hash (winnowing-style)
    sketch: min over all character-``window``-gram md5-prefix hashes.

    The k-gram hash is md5-based so the DuckDB oracle replays the sketch
    exactly (``('0x' || substring(md5(substring(text, i, 8)), 1, 16))``);
    k-grams are deduped per batch so md5 runs once per UNIQUE gram, and
    the per-document min is one segmented ``np.minimum.reduceat``.

    Hot path (round-4 verdict item 6): when the batch is pure ASCII
    (byte length == char length, the common case for web text after
    normalization), gram extraction is a numpy sliding window over the
    concatenated byte buffer — every w-byte gram becomes one fixed-width
    void key, deduped with ``np.unique`` — no per-row Python loop and no
    Python string objects for the grams.  Non-ASCII batches fall back to
    character slicing (byte-grams ≠ char-grams there, and the oracle is
    defined on characters)."""

    def __init__(self, window: int = 8) -> None:
        self.window = window

    def _gram_keys_ascii(self, bufs: list[bytes], lens: np.ndarray):
        """(counts, unique gram strings, inverse codes) via numpy windows.

        Packs each w-byte gram (w ≤ 8) into one big-endian uint64 with w
        shift-OR passes over the concatenated buffer, gathers the packed
        keys at each document's gram positions (1-D gather), and dedups
        with a single uint64 ``np.unique`` — gram bytes are only ever
        materialized for the UNIQUE keys."""
        w = self.window
        counts = np.maximum(lens - w + 1, 0)
        total = int(counts.sum())
        if total == 0:
            return counts, np.empty(0, dtype=object), np.empty(0, np.int64)
        buf = np.frombuffer(b"".join(bufs), np.uint8)
        n_win = len(buf) - w + 1
        packed = np.zeros(n_win, np.uint64)
        for j in range(w):  # big-endian: first gram byte in the high bits
            packed |= buf[j:j + n_win].astype(np.uint64) << np.uint64(
                8 * (w - 1 - j))
        starts = np.cumsum(lens) - lens
        cum0 = np.concatenate([[0], np.cumsum(counts)[:-1]])
        within = np.arange(total, dtype=np.int64) - np.repeat(cum0, counts)
        gpos = np.repeat(starts, counts) + within
        # hash-based dedup (pd.factorize) — O(n), vs sort-based np.unique
        # which argsorts all n gram keys and measured 3-4x slower here
        codes, uniq_keys = pd.factorize(packed[gpos])
        uniq_keys = np.asarray(uniq_keys, np.uint64)
        ub = uniq_keys.astype(">u8").tobytes()
        off = 8 - w
        uniq = np.array([ub[i * 8 + off:(i + 1) * 8].decode("ascii")
                         for i in range(len(uniq_keys))], dtype=object)
        return counts, uniq, codes.astype(np.int64)

    def _gram_keys_generic(self, text: pd.Series):
        w = self.window
        grams: list[str] = []
        counts = np.zeros(len(text), dtype=np.int64)
        for pos, s in enumerate(text):
            n = max(len(s) - w + 1, 0)
            counts[pos] = n
            grams.extend(s[i:i + w] for i in range(n))
        codes, uniq = pd.factorize(np.asarray(grams, dtype=object))
        return counts, np.asarray(uniq, dtype=object), codes

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        from ..functions.hashing import md5_u64

        text = batch["text"].fillna("")
        bufs = [s.encode("utf-8") for s in text]
        md5 = np.array([hashlib.md5(b).hexdigest() for b in bufs],
                       dtype=object)
        blens = np.fromiter((len(b) for b in bufs), np.int64, len(bufs))
        nchars = np.fromiter((len(s) for s in text), np.int64, len(bufs))
        if self.window <= 8 and (blens == nchars).all():  # pure ASCII
            counts, uniq, codes = self._gram_keys_ascii(bufs, blens)
        else:
            counts, uniq, codes = self._gram_keys_generic(text)
        out = np.zeros(len(text), dtype=np.uint64)
        nz = np.flatnonzero(counts)
        if len(nz):
            hv = md5_u64(uniq)[codes]
            seg = np.concatenate([[0], np.cumsum(counts[nz])[:-1]])
            out[nz] = np.minimum.reduceat(hv, seg)
        return pd.DataFrame(
            {"doc_id": batch["doc_id"].to_numpy(), "fingerprint": md5,
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


# Gopher-style heuristic document-quality rules (Rae et al. 2021, public):
# word-count bounds, mean-word-length bounds, stopword presence, and a
# repetition bound via the distinct-token ratio.  Thresholds chosen so every
# rule except mean-word-length actually fires on the testdata corpus.
QUALITY_MIN_WORDS = 20
QUALITY_MAX_WORDS = 80
QUALITY_MIN_MWL = 3.0
QUALITY_MAX_MWL = 10.0
QUALITY_MIN_DISTINCT_RATIO = 0.5


def quality_filter(sf_dir: str):
    """Gopher-style quality rules per document → per-rule booleans + ``keep``.

    Output ``(doc_id, n_words, mean_word_len, distinct_ratio, has_stopword,
    keep)``.  All comparisons run on UNROUNDED doubles (identical division
    on both engine and oracle sides); the reported ratio columns are rounded
    to 6 for the value-hash.  Vectorized: one explode + two grouped sums per
    batch, no per-row Python."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
    stop = set(STOPWORDS)

    def rules(df: pd.DataFrame) -> pd.DataFrame:
        text = df["text"].fillna("")
        toks = _token_lists(text)
        n_words = toks.str.len().astype(np.int64)
        exploded = toks.explode().dropna()
        lens = exploded.str.len().groupby(level=0).sum() \
            .reindex(df.index, fill_value=0).to_numpy(np.int64)
        stops = exploded.isin(stop).groupby(level=0).any() \
            .reindex(df.index, fill_value=False).to_numpy(bool)
        nd = exploded.groupby(level=0).nunique() \
            .reindex(df.index, fill_value=0).to_numpy(np.int64)
        n = n_words.to_numpy()
        safe_n = np.where(n > 0, n, 1)
        mwl = lens / safe_n
        dr = nd / safe_n
        keep = ((n >= QUALITY_MIN_WORDS) & (n <= QUALITY_MAX_WORDS)
                & (mwl >= QUALITY_MIN_MWL) & (mwl <= QUALITY_MAX_MWL)
                & stops & (dr >= QUALITY_MIN_DISTINCT_RATIO))
        return pd.DataFrame({
            "doc_id": df["doc_id"].to_numpy(),
            "n_words": n,
            "mean_word_len": round_half_away(np.where(n > 0, mwl, 0.0), 6),
            "distinct_ratio": round_half_away(np.where(n > 0, dr, 0.0), 6),
            "has_stopword": stops,
            "keep": keep,
        })

    return ds.map_batches(rules, batch_format="pandas")


def bag_dedup(sf_dir: str, num_partitions: int = 16):
    """Order-insensitive exact dedup: two documents with the SAME token
    multiset (bag of words) in any order collapse to one survivor.

    Canonical form = space-joined sorted token list, then the exact-dedup
    shuffle shape: vectorized 2×64-bit hash of the canonical form →
    hash-partition groupby → keep min doc_id + copy count.  The per-row
    token sort is inherent to the canonicalization (same cost class as
    shingling); everything after it is the vectorized dedup path.

    Note (same trade-off as exact_dedup): the engine groups by the 2×64-bit
    hash of the canonical form, the oracle by the canonical string itself —
    a 128-bit collision would silently merge two distinct bags.  At 2^-64
    per pair this is accepted for the shuffle width it saves (16 bytes/row
    vs the full text)."""
    from ..stages.partition import add_partition_column

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])

    def add_hash(df: pd.DataFrame) -> pd.DataFrame:
        # fillna('') BEFORE the loop: a float-NaN null makes `t or ''`
        # evaluate to NaN and .split() raise — repo-wide null convention
        canon = pd.Series(
            [" ".join(sorted(t.split())) for t in df["text"].fillna("")],
            index=df.index)
        h1 = pd.util.hash_pandas_object(canon, index=False).to_numpy()
        h2 = pd.util.hash_pandas_object(
            canon, index=False, hash_key="9c39a2b1f04d58e7").to_numpy()
        return pd.DataFrame({"doc_id": df["doc_id"].to_numpy(),
                             "h1": h1.view(np.int64), "h2": h2.view(np.int64)})

    ds = ds.map_batches(add_hash, batch_format="pandas")
    ds = add_partition_column(ds, key="h1", num_partitions=num_partitions)

    def keep_first(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["h1", "h2"], sort=False, as_index=False).agg(
            doc_id=("doc_id", "min"), n_copies=("doc_id", "size"))
        return g[["doc_id", "n_copies"]]

    return ds.groupby("part").map_groups(keep_first, batch_format="pandas")


def top_bigrams(sf_dir: str, k: int = 20, num_partitions: int = 16):
    """Corpus-level n-gram statistics: the ``k`` most frequent word bigrams
    (ALL occurrences, not per-doc distinct) — the contamination-audit /
    vocabulary-stats staple.

    Per-batch pre-aggregation (one value_counts over the batch's exploded
    bigrams) → one groupby-sum shuffle of DISTINCT (bigram, count) partials
    → per-block local top-k → tiny driver merge.  The shuffle and the
    driver both scale with the bigram VOCABULARY, never the corpus; ties
    break deterministically by (count desc, bigram asc)."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["text"])
    from ray.data.aggregate import Sum

    def partial(df: pd.DataFrame) -> "pa.Table":
        import pyarrow as pa

        grams: list[str] = []
        for t in df["text"].fillna(""):
            toks = t.split()
            grams.extend(toks[i] + " " + toks[i + 1]
                         for i in range(len(toks) - 1))
        vc = pd.Series(grams).value_counts() if grams else \
            pd.Series([], dtype=np.int64)
        return pa.table({"bigram": pa.array(vc.index.astype(str)),
                         "partial_n": pa.array(vc.to_numpy(np.int64))})

    counts = ds.map_batches(partial, batch_format="pandas") \
        .groupby("bigram").aggregate(Sum("partial_n", alias_name="n"))

    def block_topk(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(["n", "bigram"], ascending=[False, True],
                              kind="mergesort").head(k)

    merged = counts.map_batches(block_topk, batch_format="pandas").to_pandas()
    return merged.sort_values(["n", "bigram"], ascending=[False, True],
                              kind="mergesort").head(k).reset_index(drop=True)


# A stand-in benchmark-contamination n-gram set (in production: thousands of
# eval-set n-grams, broadcast once via ray.put).  Chosen to actually occur
# in the testdata corpus.
CONTAMINATION_NGRAMS = ("table hash", "part filter", "slow key")


class ContaminationChecker:
    """Actor-pool stage: flag documents containing any of a broadcast
    contamination n-gram set.  The combined alternation regex compiles ONCE
    per actor (construct-once seam); per batch it's one vectorized
    ``str.count``.  ``n_hits`` counts all (non-overlapping) occurrences
    across the set — the evidence weight dedup/decontamination filters key
    on."""

    def __init__(self, ngrams: tuple[str, ...] = CONTAMINATION_NGRAMS) -> None:
        import re

        self.pattern = re.compile("|".join(re.escape(g) for g in ngrams))

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        text = batch["text"].fillna("")
        hits = text.str.count(self.pattern).astype(np.int64)
        return pd.DataFrame({"doc_id": batch["doc_id"].to_numpy(),
                             "n_hits": hits.to_numpy(),
                             "contaminated": (hits > 0).to_numpy()})


def contamination_flags(sf_dir: str, concurrency: int = 2):
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
    return ds.map_batches(ContaminationChecker, batch_format="pandas",
                          batch_size=4096, concurrency=concurrency)


def rarest_terms(sf_dir: str):
    """Per-document most-distinctive term: the token with the LOWEST corpus
    document frequency (ties → lexicographically first) — the integer-exact
    core of a tf-idf weighting, without the float log that would make the
    oracle hash fragile.

    Two stages sharing one scan shape: (1) document frequencies — per-batch
    DISTINCT (doc, term) explode (each doc lives in exactly one batch, so
    batch-distinct pairs are globally distinct) → one vocabulary-bounded
    groupby-sum; (2) the df table (vocab-sized) broadcasts ONCE via
    ``ray.put`` and each batch picks its docs' argmin (df, term) with a
    sort + grouped-first — the computed-statistic broadcast-join pattern
    (never a row-level shuffle of the corpus)."""
    import pyarrow as pa

    import ray

    from ray.data.aggregate import Sum

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])

    def df_partial(df: pd.DataFrame) -> pa.Table:
        toks = _token_lists(df["text"])
        ex = toks.explode().dropna()
        pairs = pd.DataFrame({"doc": ex.index, "term": ex.to_numpy()}) \
            .drop_duplicates()
        vc = pairs["term"].value_counts()
        return pa.table({"term": pa.array(vc.index.astype(str)),
                         "partial_df": pa.array(vc.to_numpy(np.int64))})

    dfs = ds.map_batches(df_partial, batch_format="pandas") \
        .groupby("term").aggregate(Sum("partial_df", alias_name="doc_freq")) \
        .to_pandas()
    ref = ray.put(pd.Series(dfs["doc_freq"].to_numpy(np.int64),
                            index=dfs["term"].to_numpy()))

    def pick(df: pd.DataFrame) -> pd.DataFrame:
        import ray as _ray

        dfmap = _ray.get(ref)
        toks = _token_lists(df["text"])
        ex = toks.explode().dropna()
        pairs = pd.DataFrame({"doc_id": df["doc_id"].reindex(ex.index).to_numpy(),
                              "term": ex.to_numpy()}).drop_duplicates()
        pairs["doc_freq"] = dfmap.reindex(pairs["term"]).to_numpy(np.int64)
        pairs = pairs.sort_values(["doc_id", "doc_freq", "term"],
                                  kind="mergesort")
        first = pairs.groupby("doc_id", sort=False).head(1)
        return pd.DataFrame({"doc_id": first["doc_id"].to_numpy(),
                             "rarest_term": first["term"].to_numpy(),
                             "doc_freq": first["doc_freq"].to_numpy(np.int64)})

    return ds.map_batches(pick, batch_format="pandas")


def tfidf_top_terms(sf_dir: str, k: int = 3):
    """Per-document top-``k`` tf-idf terms (the keyword-extraction staple on
    the way to sparse retrieval / BM25): for each doc the ``k`` terms ranked
    by term frequency desc, then document frequency asc, then term asc — an
    INTEGER-EXACT ordering (ties in the float tf-idf score cannot make the
    oracle hash fragile) — with the float score ``tf · ln(N/df)`` emitted as
    a value column (rounded, computed identically in SQL).

    Same two-stage shape as :func:`rarest_terms`: (1) per-batch distinct
    (doc, term, tf) partials → vocabulary-bounded df groupby; (2) the df
    table broadcasts once via ``ray.put``; each batch ranks its own docs'
    terms with one sort + grouped head-k.  The corpus text never shuffles."""
    import pyarrow as pa

    import ray

    from ray.data.aggregate import Sum

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])

    def df_partial(df: pd.DataFrame) -> pa.Table:
        toks = _token_lists(df["text"])
        ex = toks.explode().dropna()
        pairs = pd.DataFrame({"doc": ex.index, "term": ex.to_numpy()}) \
            .drop_duplicates()
        vc = pairs["term"].value_counts()
        return pa.table({"term": pa.array(vc.index.astype(str)),
                         "partial_df": pa.array(vc.to_numpy(np.int64))})

    dfs = ds.map_batches(df_partial, batch_format="pandas") \
        .groupby("term").aggregate(Sum("partial_df", alias_name="doc_freq")) \
        .to_pandas()
    n_docs = int(ds.count())
    ref = ray.put(pd.Series(dfs["doc_freq"].to_numpy(np.int64),
                            index=dfs["term"].to_numpy()))

    def pick(df: pd.DataFrame) -> pd.DataFrame:
        import ray as _ray

        dfmap = _ray.get(ref)
        toks = _token_lists(df["text"])
        ex = toks.explode().dropna()
        pairs = pd.DataFrame({"doc_id": df["doc_id"].reindex(ex.index).to_numpy(),
                              "term": ex.to_numpy()})
        tf = pairs.groupby(["doc_id", "term"], sort=False).size() \
            .reset_index(name="tf")
        tf["doc_freq"] = dfmap.reindex(tf["term"]).to_numpy(np.int64)
        tf = tf.sort_values(["doc_id", "tf", "doc_freq", "term"],
                            ascending=[True, False, True, True],
                            kind="mergesort")
        top = tf.groupby("doc_id", sort=False).head(k).copy()
        top["rank"] = top.groupby("doc_id", sort=False).cumcount() + 1
        score = top["tf"].to_numpy(np.int64) \
            * np.log(n_docs / top["doc_freq"].to_numpy(np.float64))
        return pd.DataFrame({"doc_id": top["doc_id"].to_numpy(np.int64),
                             "rank": top["rank"].to_numpy(np.int64),
                             "term": top["term"].to_numpy(),
                             "tf": top["tf"].to_numpy(np.int64),
                             "doc_freq": top["doc_freq"].to_numpy(np.int64),
                             "tfidf": round_half_away(score, 6)})

    return ds.map_batches(pick, batch_format="pandas")


def tfidf_top_terms_oracle_sql(k: int = 3) -> str:
    return f"""
        WITH toks AS (
            SELECT doc_id, unnest(list_filter(
                regexp_split_to_array(coalesce(text, ''), '\\s+'),
                x -> x <> '')) AS term
            FROM documents),
        tf AS (SELECT doc_id, term, count(*) AS tf
               FROM toks GROUP BY doc_id, term),
        dfreq AS (SELECT term, count(DISTINCT doc_id) AS doc_freq
                  FROM toks GROUP BY term),
        n AS (SELECT count(*) AS n_docs FROM documents),
        ranked AS (
            SELECT tf.doc_id, tf.term, tf.tf, dfreq.doc_freq,
                   row_number() OVER (PARTITION BY tf.doc_id
                       ORDER BY tf.tf DESC, dfreq.doc_freq ASC, tf.term ASC)
                       AS rank,
                   round(tf.tf * ln(n.n_docs / dfreq.doc_freq), 6) AS tfidf
            FROM tf JOIN dfreq USING (term) CROSS JOIN n)
        SELECT doc_id, rank, term, tf, doc_freq, tfidf
        FROM ranked WHERE rank <= {k}"""


def unigram_surprisal(sf_dir: str):
    """Per-document mean unigram surprisal ``-mean(ln(count(tok)/total))``
    — the corpus-LM perplexity proxy used as a quality / outlier signal in
    training-data filtering (a document of globally-rare tokens scores
    high; boilerplate scores low).

    Same computed-statistic broadcast shape as :func:`rarest_terms`: the
    vocabulary-bounded unigram count table aggregates once (shuffle moves
    one row per distinct token per batch), broadcasts via ``ray.put``, and
    every batch scores its own docs with one reindex + grouped mean.  Docs
    with no tokens are absent (no LM evidence), matching the oracle join."""
    import pyarrow as pa

    import ray

    from ray.data.aggregate import Sum

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])

    def cnt_partial(df: pd.DataFrame) -> pa.Table:
        toks = _token_lists(df["text"])
        ex = toks.explode().dropna()
        vc = ex.value_counts()
        return pa.table({"term": pa.array(vc.index.astype(str)),
                         "partial_n": pa.array(vc.to_numpy(np.int64))})

    cnts = ds.map_batches(cnt_partial, batch_format="pandas") \
        .groupby("term").aggregate(Sum("partial_n", alias_name="n")) \
        .to_pandas()
    total = int(cnts["n"].sum())
    ref = ray.put(pd.Series(cnts["n"].to_numpy(np.int64),
                            index=cnts["term"].to_numpy()))

    def score(df: pd.DataFrame) -> pd.DataFrame:
        import ray as _ray

        cmap = _ray.get(ref)
        toks = _token_lists(df["text"])
        ex = toks.explode().dropna()
        if not len(ex):
            return pd.DataFrame({"doc_id": pd.Series([], dtype=np.int64),
                                 "n_tokens": pd.Series([], dtype=np.int64),
                                 "surprisal": pd.Series([], dtype=float)})
        logp = np.log(cmap.reindex(ex.to_numpy()).to_numpy(np.float64)
                      / total)
        g = pd.DataFrame({"doc_id": df["doc_id"].reindex(ex.index).to_numpy(),
                          "logp": logp}) \
            .groupby("doc_id", sort=False)["logp"].agg(["size", "mean"]) \
            .reset_index()
        return pd.DataFrame({"doc_id": g["doc_id"].to_numpy(np.int64),
                             "n_tokens": g["size"].to_numpy(np.int64),
                             "surprisal": round_half_away(-g["mean"], 6)})

    return ds.map_batches(score, batch_format="pandas")


def unigram_surprisal_oracle_sql() -> str:
    return """
        WITH toks AS (
            SELECT doc_id, unnest(list_filter(
                regexp_split_to_array(coalesce(text, ''), '\\s+'),
                x -> x <> '')) AS term
            FROM documents),
        cnt AS (SELECT term, count(*) AS n FROM toks GROUP BY term),
        tot AS (SELECT count(*) AS t FROM toks)
        SELECT doc_id, count(*) AS n_tokens,
               round(-avg(ln(cnt.n / tot.t)), 6) AS surprisal
        FROM toks JOIN cnt USING (term) CROSS JOIN tot
        GROUP BY doc_id"""


def vocab_top_tokens(sf_dir: str, vocab_size: int = 1000):
    """Vocabulary construction (tokenizer-training step): the ``vocab_size``
    most frequent whitespace tokens with dense 0-based ids, ranked by
    (count desc, token asc) — an integer-exact order, so the id assignment
    is deterministic and SQL-replayable.

    Shuffle = one vocabulary-bounded count aggregate (distinct tokens per
    batch move, never occurrences); the top-V cut runs on the aggregated
    table.  At web scale the aggregate is the same shape as top_bigrams —
    block-local partials then a token-keyed merge."""
    from ray.data.aggregate import Sum

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])

    def cnt_partial(df: pd.DataFrame) -> pd.DataFrame:
        vc = _token_lists(df["text"]).explode().dropna().value_counts()
        return pd.DataFrame({"token": vc.index.astype(str),
                             "partial_n": vc.to_numpy(np.int64)})

    cnts = ds.map_batches(cnt_partial, batch_format="pandas") \
        .groupby("token").aggregate(Sum("partial_n", alias_name="n")) \
        .to_pandas()
    cnts = cnts.sort_values(["n", "token"], ascending=[False, True],
                            kind="mergesort").head(vocab_size) \
        .reset_index(drop=True)
    cnts["token_id"] = np.arange(len(cnts), dtype=np.int64)
    return cnts[["token_id", "token", "n"]]


def vocab_top_tokens_oracle_sql(vocab_size: int = 1000) -> str:
    return f"""
        WITH tk AS (
            SELECT unnest(list_filter(
                regexp_split_to_array(coalesce(text, ''), '\\s+'),
                x -> x <> '')) AS token
            FROM documents),
        cnt AS (SELECT token, count(*) AS n FROM tk GROUP BY token)
        SELECT row_number() OVER (ORDER BY n DESC, token ASC) - 1 AS token_id,
               token, n
        FROM cnt ORDER BY n DESC, token ASC LIMIT {vocab_size}"""


def tokenize_docs(sf_dir: str, vocab_size: int = 1000):
    """Tokenizer ENCODE: every document's whitespace tokens mapped to the
    :func:`vocab_top_tokens` ids in order (OOV → -1), emitted as a
    space-joined id string (a stable, hashable serialization of the id
    sequence — the doc→token-ids step before sequence packing).

    The vocab (≤ vocab_size rows) broadcasts via ``ray.put``; each batch
    explodes its own tokens with positions and joins locally — corpus text
    never shuffles.  Docs with no tokens are absent (nothing to encode)."""
    import ray

    vocab = vocab_top_tokens(sf_dir, vocab_size)
    ref = ray.put(pd.Series(vocab["token_id"].to_numpy(np.int64),
                            index=vocab["token"].to_numpy()))

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])

    def encode(df: pd.DataFrame) -> pd.DataFrame:
        import ray as _ray

        vmap = _ray.get(ref)
        ex = _token_lists(df["text"]).explode().dropna()
        if not len(ex):
            return pd.DataFrame({"doc_id": pd.Series([], dtype=np.int64),
                                 "n_tokens": pd.Series([], dtype=np.int64),
                                 "ids": pd.Series([], dtype=str)})
        ids = vmap.reindex(ex.to_numpy()).fillna(-1).astype(np.int64)
        g = pd.DataFrame({"doc_id": df["doc_id"].reindex(ex.index).to_numpy(),
                          "id_str": ids.to_numpy().astype(str)}) \
            .groupby("doc_id", sort=False)["id_str"] \
            .agg([("n_tokens", "size"), ("ids", " ".join)]).reset_index()
        return pd.DataFrame({"doc_id": g["doc_id"].to_numpy(np.int64),
                             "n_tokens": g["n_tokens"].to_numpy(np.int64),
                             "ids": g["ids"].to_numpy()})

    return ds.map_batches(encode, batch_format="pandas")


def tokenize_docs_oracle_sql(vocab_size: int = 1000) -> str:
    return f"""
        WITH vocab AS ({vocab_top_tokens_oracle_sql(vocab_size)}),
        toks AS (
            SELECT doc_id, lst[i] AS term, i AS pos
            FROM (SELECT doc_id, list_filter(
                      regexp_split_to_array(coalesce(text, ''), '\\s+'),
                      x -> x <> '') AS lst FROM documents),
                 UNNEST(generate_series(1, len(lst))) AS t(i))
        SELECT doc_id, count(*) AS n_tokens,
               string_agg(CAST(coalesce(v.token_id, -1) AS VARCHAR), ' '
                          ORDER BY pos) AS ids
        FROM toks LEFT JOIN vocab v ON v.token = toks.term
        GROUP BY doc_id"""


def json_extract_events(sf_dir: str):
    """Typed field extraction from the JSON ``props`` column of events
    (semi-structured ingestion staple): ``(event_id, k)`` with ``k`` the
    integer at top-level ``$.k``, null when absent or malformed.

    A REAL JSON parse per value (a regex would false-match nested objects
    and keys inside string values where the oracle's ``json_extract`` is
    strictly top-level) — the parse is the irreducible cost of the
    operator; unique ``props`` values are factorized first so it runs once
    per DISTINCT payload, not per row."""
    import json

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_id", "props"])

    def extract(df: pd.DataFrame) -> pd.DataFrame:
        codes, uniq = pd.factorize(df["props"].fillna(""))

        def one(s: str):
            try:
                v = json.loads(s).get("k")
            except (ValueError, AttributeError):
                return None
            return int(v) if isinstance(v, int) and not isinstance(v, bool) \
                else None

        per_uniq = np.array([one(s) for s in uniq], dtype=object)
        return pd.DataFrame({"event_id": df["event_id"].to_numpy(),
                             "k": pd.array(per_uniq[codes], dtype="Int64")})

    return ds.map_batches(extract, batch_format="pandas")


def source_mix_weights(sf_dir: str):
    """Domain-mixture statistics (the input to data-mixing weight choices in
    LLM corpus assembly): per (lang, source) block the document count, the
    whitespace-token total, its share of the corpus, and the up/down-sampling
    weight that would flatten the mixture to uniform.

    Per-batch partials → one tiny (lang, source) groupby — the shuffle moves
    one row per (block, batch).  The share/weight arithmetic runs on the
    aggregated result (≤ |lang|×|source| rows — driver-safe at any corpus
    size; the heavy token counting stays distributed)."""
    import pyarrow as pa

    from ray.data.aggregate import Sum

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["lang", "source", "text"])

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        # null lang/source keys as "" (the sampler convention here) — a bare
        # pandas groupby would DROP null-keyed rows while the oracle's GROUP
        # BY keeps them, skewing every share/weight
        df["lang"] = df["lang"].fillna("")
        df["source"] = df["source"].fillna("")
        df["ws"] = df["text"].fillna("").str.split().str.len().astype(np.int64)
        g = df.groupby(["lang", "source"], sort=False).agg(
            partial_docs=("ws", "size"), partial_tokens=("ws", "sum")) \
            .reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    # (lang × source)-bounded partials: streamed driver fold instead of
    # a full AllToAll fixed cost for a few dozen distinct rows
    from .relational import _merge_bounded_partials

    agg = _merge_bounded_partials(
        ds.map_batches(partial, batch_format="pyarrow",
                       zero_copy_batch=True),
        keys=["lang", "source"],
        sums={"partial_docs": "n_docs", "partial_tokens": "n_tokens"})
    if agg is None:  # empty documents table
        agg = pd.DataFrame({"lang": pd.Series([], dtype=object),
                            "source": pd.Series([], dtype=object),
                            "n_docs": pd.Series([], dtype=np.int64),
                            "n_tokens": pd.Series([], dtype=np.int64)})
    total = int(agg["n_tokens"].sum())
    groups = len(agg)
    with np.errstate(divide="ignore", invalid="ignore"):
        share = agg["n_tokens"].to_numpy(np.float64) / total
        # weight that flattens the mixture: uniform target / observed share.
        # A zero-token block has share 0 → numpy would emit inf where the SQL
        # replay's x/0 yields NULL; define the case as NULL on both sides
        # (NaN here materializes as parquet NULL)
        weight = np.where(share == 0.0, np.nan, (1.0 / groups) / share)
    agg["token_share"] = round_half_away(share, 6)
    agg["mix_weight"] = round_half_away(weight, 6)
    return agg.sort_values(["lang", "source"]).reset_index(drop=True)


def source_mix_weights_oracle_sql() -> str:
    return """
        WITH g AS (
            SELECT coalesce(lang, '') AS lang, coalesce(source, '') AS source,
                   count(*) AS n_docs,
                   CAST(sum(len(list_filter(
                       regexp_split_to_array(coalesce(text, ''), '\\s+'),
                       x -> x <> ''))) AS BIGINT) AS n_tokens
            FROM documents GROUP BY coalesce(lang, ''), coalesce(source, ''))
        SELECT lang, source, n_docs, n_tokens,
               round(n_tokens / sum(n_tokens) OVER (), 6) AS token_share,
               round((1.0 / count(*) OVER ())
                     / (n_tokens / sum(n_tokens) OVER ()), 6) AS mix_weight
        FROM g"""


def doc_length_buckets(sf_dir: str):
    """Length-bucket assignment (sequence-length bucketing for batch packing):
    each document labeled 1-4 by which per-lang n_chars quartile it falls in.

    Two stages, both bounded: the exact per-lang quartile cuts come from the
    distributed value-counts rollup (shuffle = distinct (lang, n_chars)
    pairs, NOT rows); the tiny cuts table (3 values per lang) broadcasts via
    ``ray.put`` and every batch assigns buckets with three vectorized
    comparisons — value-based bucketing, so no global rank/sort is needed
    (NTILE's rank semantics would force one)."""
    import ray

    from .relational import quantile_rollup

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "lang", "n_chars"])
    cuts = quantile_rollup(ds, "lang", "n_chars", (0.25, 0.5, 0.75),
                           suffix="nc").to_pandas()
    cuts_ref = ray.put(cuts[["lang", "p25_nc", "p50_nc", "p75_nc"]])

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        # inner merge against the tiny broadcast cuts frame: vectorized, and
        # a lang with no cuts row (null lang never groups) DROPS its rows —
        # the oracle's JOIN ... USING (lang) semantics, not a crash
        m = df[["doc_id", "lang", "n_chars"]].merge(
            ray.get(cuts_ref), on="lang", how="inner")
        v = m["n_chars"].to_numpy(np.int64)
        bucket = (1 + (v > m["p25_nc"].to_numpy(np.int64)).astype(np.int64)
                  + (v > m["p50_nc"].to_numpy(np.int64))
                  + (v > m["p75_nc"].to_numpy(np.int64)))
        return pd.DataFrame({"doc_id": m["doc_id"].to_numpy(),
                             "lang": m["lang"].to_numpy(),
                             "bucket": bucket})

    return ds.map_batches(assign, batch_format="pandas")


def doc_length_buckets_oracle_sql() -> str:
    return """
        WITH c AS (SELECT lang,
                          quantile_disc(n_chars, 0.25) AS c1,
                          quantile_disc(n_chars, 0.5) AS c2,
                          quantile_disc(n_chars, 0.75) AS c3
                   FROM documents GROUP BY lang)
        SELECT doc_id, d.lang,
               1 + (n_chars > c1)::BIGINT + (n_chars > c2)::BIGINT
                 + (n_chars > c3)::BIGINT AS bucket
        FROM documents d JOIN c USING (lang)"""


def flatten_conversations(ds, num_partitions: int = 16):
    """Transcript → training document: one row per conversation, turns
    concatenated as ``role: text`` lines in stable ``turn_idx`` order (the
    canonical transcript→pretraining-doc step; the reference's per-page →
    per-document write-back is the same shape, main/remove_watermark.py:131).

    ONE conv_id-hash shuffle co-locates each conversation; the per-partition
    pandas groupby-join is O(total chars) string concatenation — no
    driver-side materialization, output is one (bounded) row per conv."""
    ds = ds.select_columns(["conv_id", "turn_idx", "role", "text"])

    def flat(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["conv_id", "turn_idx"], kind="mergesort")
        line = df["role"] + ": " + df["text"].fillna("")
        g = line.groupby(df["conv_id"].to_numpy(), sort=True)
        doc = g.agg("\n".join)
        n_turns = g.size()
        return pd.DataFrame({"conv_id": doc.index,
                             "n_turns": n_turns.to_numpy(np.int64),
                             "n_chars": doc.str.len().to_numpy(np.int64),
                             "doc": doc.to_numpy()})

    from ..stages.partition import partitioned_map

    return partitioned_map(ds, flat, key="conv_id",
                           num_partitions=num_partitions)


PACK_BUDGET_TOKENS = 512


def pack_sequences(sf_dir: str, budget: int = PACK_BUDGET_TOKENS,
                   num_partitions: int = 16):
    """GPT-style sequence packing: documents concatenated in doc_id order and
    chunked into fixed token-budget packs — each document belongs to the pack
    in which it STARTS (pack_id = global exclusive prefix-sum of its tokens,
    floor-divided by the budget; boundary docs straddle, as in pretraining
    concat-then-chunk packing).

    Distributed prefix sum over a global order, three bounded steps:
      1. narrow projection (doc_id, ws_tokens) — the text column is read
         once and DROPPED before any shuffle; the projection is materialized
         (2 int64 columns, ~0.1% of corpus bytes at 100 TB);
      2. per-range-bucket partial sums → a ``num_partitions``-row table on
         the driver → exclusive scan → broadcast offsets;
      3. per-bucket map_groups: local exclusive cumsum + bucket offset.
    Shuffle and driver traffic are both O(ints), never O(text)."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])

    def toks(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_id": df["doc_id"].to_numpy(np.int64),
            "ws_tokens": df["text"].fillna("").str.split().str.len()
            .to_numpy(np.int64)})

    tok = ds.map_batches(toks, batch_format="pandas").materialize()
    mx = tok.max("doc_id")
    if mx is None:  # empty corpus: empty typed result, not a crash
        return ray.data.from_pandas(pd.DataFrame({
            "doc_id": pd.Series([], dtype=np.int64),
            "ws_tokens": pd.Series([], dtype=np.int64),
            "pack_id": pd.Series([], dtype=np.int64)}))
    max_id = int(mx)
    span = max(1, (max_id + num_partitions) // num_partitions)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        b = df["doc_id"].to_numpy(np.int64) // span
        g = pd.Series(df["ws_tokens"].to_numpy(np.int64)).groupby(b).sum()
        return pd.DataFrame({"bucket": g.index.to_numpy(np.int64),
                             "partial_toks": g.to_numpy(np.int64)})

    # the partials table is bucket-domain-bounded (<= num_partitions rows
    # per batch), so fold it on the driver (streamed) — a Dataset groupby
    # here would pay a full AllToAll fixed cost to merge a few hundred rows
    from .relational import _merge_bounded_partials

    per_bucket = _merge_bounded_partials(
        tok.map_batches(partial, batch_format="pandas"),
        keys=["bucket"], sums={"partial_toks": "toks"})
    totals = np.zeros(num_partitions + 1, np.int64)
    if per_bucket is not None:
        totals[per_bucket["bucket"].to_numpy(np.int64)] = \
            per_bucket["toks"].to_numpy(np.int64)
    offsets = np.concatenate(([0], np.cumsum(totals)[:-1]))

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("doc_id", kind="mergesort")
        t = df["ws_tokens"].to_numpy(np.int64)
        b = int(df["doc_id"].iloc[0]) // span
        cum_before = offsets[b] + np.cumsum(t) - t
        return pd.DataFrame({"doc_id": df["doc_id"].to_numpy(),
                             "ws_tokens": t,
                             "pack_id": cum_before // budget})

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        return df.assign(bucket=df["doc_id"].to_numpy(np.int64) // span)

    return tok.map_batches(add_bucket, batch_format="pandas") \
        .groupby("bucket").map_groups(assign, batch_format="pandas")


def dedup_turns(ds, num_partitions: int = 16):
    """Corpus-wide UNIT-level exact dedup (the C4/RefinedWeb line-dedup
    shape, with the turn as the unit): keep only the FIRST occurrence of
    every distinct turn text across the whole corpus, first = lexicographic
    min (ts, conv_id, turn_idx) — an ORDER-DEFINED winner, unlike
    :func:`..pipelines.dedup.exact_dedup`'s min-key winner over whole docs.

    Scale path: each batch pre-reduces to ONE candidate row per distinct
    text (sort + drop_duplicates — vectorized), so the text-hash shuffle
    moves at most one row per (text, batch); the per-partition winner pick
    repeats the same vectorized selection.  Returns ``(conv_id, turn_idx)``
    of surviving turns.
    """
    from ..stages.partition import partitioned_map
    from ..stages.windows import ts_us_series

    def premin(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({
            "text": df["text"].fillna(""),
            "ts_us": ts_us_series(df["ts"]),
            "conv_id": df["conv_id"].to_numpy(),
            "turn_idx": df["turn_idx"].to_numpy(np.int32),
        })
        return out.sort_values(["text", "ts_us", "conv_id", "turn_idx"],
                               kind="mergesort").drop_duplicates("text")

    def winner(df: pd.DataFrame) -> pd.DataFrame:
        w = df.sort_values(["text", "ts_us", "conv_id", "turn_idx"],
                           kind="mergesort").drop_duplicates("text")
        return pd.DataFrame({"conv_id": w["conv_id"].to_numpy(),
                             "turn_idx": w["turn_idx"].to_numpy(np.int32)})

    pre = ds.map_batches(premin, batch_format="pandas")
    return partitioned_map(pre, winner, key="text",
                           num_partitions=num_partitions)


def dedup_turns_oracle_sql(transcripts_cte: str) -> str:
    return f"""WITH {transcripts_cte}
        SELECT conv_id, turn_idx FROM (
            SELECT conv_id, turn_idx,
                   row_number() OVER (PARTITION BY coalesce(text, '')
                                      ORDER BY ts, conv_id, turn_idx) AS rn
            FROM transcripts) WHERE rn = 1"""


# ordered (pattern, replacement) rules: emails before phones before bare
# digit runs, so an email's digits are consumed by <EMAIL>, not <NUM>.
# Dialect-shared regexes (python re and DuckDB RE2 agree on all of these).
PII_RULES = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "<PHONE>"),
    (r"\d+", "<NUM>"),
)


class PIIRedactor:
    """Actor-pool PII scrub: ordered regex redaction rules compiled ONCE per
    actor (``__init__``), applied vectorized per batch — the same
    delete-by-pattern discipline as the reference's T1/T2 name/footer rules
    (``mechanisms/watermark_processor.py:64-90``) pointed at PII instead of
    watermarks.  Emits the redacted text plus the redaction count (matches
    counted on the progressively-redacted string, so rules never
    double-count each other's spans)."""

    def __init__(self, rules=PII_RULES) -> None:
        import re as _re

        self.rules = [(_re.compile(p), r) for p, r in rules]

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        s = batch["text"].fillna("")
        n = np.zeros(len(batch), np.int64)
        for pat, repl in self.rules:
            n += s.str.count(pat).to_numpy(np.int64)
            s = s.str.replace(pat, repl, regex=True)
        return pd.DataFrame({
            "conv_id": batch["conv_id"].to_numpy(),
            "turn_idx": batch["turn_idx"].to_numpy(np.int32),
            "clean_text": s.to_numpy(),
            "n_redactions": n,
        })


def pii_redact_turns(ds, concurrency: int = 2):
    """PII redaction over transcript turns — stateless per row, so a pure
    actor-pool ``map_batches`` with zero shuffle."""
    return ds.map_batches(PIIRedactor, batch_format="pandas",
                          concurrency=concurrency, batch_size=4096)


def pii_redact_oracle_sql(transcripts_cte: str) -> str:
    email, phone, num = (p for p, _ in PII_RULES)
    return f"""WITH {transcripts_cte},
        s0 AS (SELECT conv_id, turn_idx, coalesce(text, '') AS t0
               FROM transcripts),
        s1 AS (SELECT conv_id, turn_idx,
                      len(regexp_extract_all(t0, '{email}')) AS n1,
                      regexp_replace(t0, '{email}', '<EMAIL>', 'g') AS t1
               FROM s0),
        s2 AS (SELECT conv_id, turn_idx, n1,
                      len(regexp_extract_all(t1, '{phone}')) AS n2,
                      regexp_replace(t1, '{phone}', '<PHONE>', 'g') AS t2
               FROM s1),
        s3 AS (SELECT conv_id, turn_idx, n1, n2,
                      len(regexp_extract_all(t2, '{num}')) AS n3,
                      regexp_replace(t2, '{num}', '<NUM>', 'g') AS t3
               FROM s2)
        SELECT conv_id, turn_idx, t3 AS clean_text,
               CAST(n1 + n2 + n3 AS BIGINT) AS n_redactions FROM s3"""


def repetition_scores(sf_dir: str):
    """Gopher-style within-document REPETITION signals per document:
    ``dup_word_frac`` (1 − distinct/total tokens) and ``top_bigram_frac``
    (occurrences of the most frequent bigram / total bigrams) — the
    repetition axis of quality filtering (Rae et al. 2021 §A1.1), composing
    with the length/stopword rules of :func:`quality_filter`.

    Entirely per-document ⇒ NO shuffle at all: one vectorized explode per
    batch (np.repeat doc codes + one flat token array), duplicate counting
    via drop_duplicates, bigrams via shifted-array equality — never a
    Python loop over rows or tokens."""

    def scores(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].fillna("").str.split()
        n = toks.str.len().to_numpy(np.int64)
        doc = np.repeat(np.arange(len(df)), n)
        flat = np.concatenate([*toks, np.array([], dtype=object)]) \
            .astype(object)  # object dtype: elementwise str + str below
        tk = pd.DataFrame({"d": doc, "w": flat})
        distinct = tk.drop_duplicates(["d", "w"]).groupby("d").size()
        dup = np.zeros(len(df), np.float64)
        nz = n > 0
        dist_full = np.zeros(len(df), np.float64)
        dist_full[distinct.index.to_numpy()] = distinct.to_numpy()
        dup[nz] = 1.0 - dist_full[nz] / n[nz]
        # bigrams: adjacent positions within the same doc
        same = doc[:-1] == doc[1:] if len(doc) else np.zeros(0, bool)
        bg = pd.DataFrame({"d": doc[:-1][same],
                           "b": flat[:-1][same] + "\x00" + flat[1:][same]})
        top = np.zeros(len(df), np.float64)
        if len(bg):
            mc = bg.groupby(["d", "b"]).size().groupby("d").max()
            top[mc.index.to_numpy()] = mc.to_numpy()
        frac = np.zeros(len(df), np.float64)
        many = n > 1
        frac[many] = top[many] / (n[many] - 1)
        from ..functions.rounding import round_half_away as _r

        return pd.DataFrame({"doc_id": df["doc_id"].to_numpy(np.int64),
                             "dup_word_frac": _r(dup, 6),
                             "top_bigram_frac": _r(frac, 6)})

    return ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text"]) \
        .map_batches(scores, batch_format="pandas", batch_size=2048)


def repetition_scores_oracle_sql() -> str:
    return """
        WITH base AS (
            SELECT doc_id, list_filter(
                regexp_split_to_array(coalesce(text, ''), '\\s+'),
                x -> x <> '') AS l
            FROM documents),
        tk AS (SELECT doc_id, l[i] AS tok, i
               FROM base, UNNEST(generate_series(1, len(l))) AS t(i)),
        dw AS (SELECT doc_id, count(*) AS n, count(DISTINCT tok) AS d
               FROM tk GROUP BY doc_id),
        bg AS (SELECT a.doc_id, a.tok AS t1, b.tok AS t2, count(*) AS c
               FROM tk a JOIN tk b ON a.doc_id = b.doc_id AND b.i = a.i + 1
               GROUP BY 1, 2, 3),
        mb AS (SELECT doc_id, max(c) AS mc FROM bg GROUP BY doc_id)
        SELECT base.doc_id,
               round(CASE WHEN coalesce(n, 0) > 0
                          THEN 1.0 - d * 1.0 / n ELSE 0.0 END, 6)
                   AS dup_word_frac,
               round(CASE WHEN coalesce(n, 0) > 1
                          THEN coalesce(mc, 0) * 1.0 / (n - 1)
                          ELSE 0.0 END, 6) AS top_bigram_frac
        FROM base LEFT JOIN dw USING (doc_id) LEFT JOIN mb USING (doc_id)"""


def collapse_repeat_turns(ds, num_partitions: int = 16):
    """ORDERED window dedup within a conversation: drop every turn whose
    text equals the IMMEDIATELY PREVIOUS turn's text (by turn_idx) in the
    same conversation — the streaming-transcript analog of consecutive-
    duplicate-line collapse (distinct from :func:`dedup_turns`, which is
    corpus-global and order-winner-based).  Rides the shared conv-hash
    shuffle; the compare is one vectorized shift per partition.  Returns
    surviving ``(conv_id, turn_idx)``."""
    from ..stages.partition import partitioned_map

    def collapse(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["conv_id", "turn_idx"], kind="mergesort")
        txt = df["text"].fillna("").to_numpy(object)
        conv = df["conv_id"].to_numpy()
        tix = df["turn_idx"].to_numpy(np.int64)
        dup = np.zeros(len(df), bool)
        if len(df) > 1:
            dup[1:] = (conv[1:] == conv[:-1]) & (tix[1:] == tix[:-1] + 1) \
                & (txt[1:] == txt[:-1])
        keep = df[~dup]
        return pd.DataFrame({"conv_id": keep["conv_id"].to_numpy(),
                             "turn_idx": keep["turn_idx"].to_numpy(np.int32)})

    return partitioned_map(ds, collapse, key="conv_id",
                           num_partitions=num_partitions)


def collapse_repeats_oracle_sql(transcripts_cte: str) -> str:
    return f"""WITH {transcripts_cte}
        SELECT conv_id, turn_idx FROM (
            SELECT conv_id, turn_idx, coalesce(text, '') AS t,
                   lag(coalesce(text, '')) OVER (
                       PARTITION BY conv_id ORDER BY turn_idx) AS prev_t,
                   turn_idx - lag(turn_idx) OVER (
                       PARTITION BY conv_id ORDER BY turn_idx) AS gap
            FROM transcripts)
        WHERE prev_t IS NULL OR gap <> 1 OR t <> prev_t"""


def normalize_docs(sf_dir: str, concurrency: int = 2):
    """Text NORMALIZATION stage (the pre-tokenization cleanup of every
    corpus pipeline): lowercase → strip non-alphanumerics → collapse
    whitespace runs → trim.  Stateless, vectorized pandas-str kernels, zero
    shuffle; regexes compiled once per actor."""
    import re as _re

    class Normalizer:
        def __init__(self) -> None:
            self.strip = _re.compile(r"[^a-z0-9 ]+")
            self.ws = _re.compile(r" +")

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            s = df["text"].fillna("").str.lower() \
                .str.replace(self.strip, " ", regex=True) \
                .str.replace(self.ws, " ", regex=True).str.strip()
            return pd.DataFrame({"doc_id": df["doc_id"].to_numpy(np.int64),
                                 "norm_text": s.to_numpy()})

    return ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text"]) \
        .map_batches(Normalizer, batch_format="pandas",
                     concurrency=concurrency, batch_size=4096)


def normalize_docs_oracle_sql() -> str:
    return """
        SELECT doc_id,
               trim(regexp_replace(regexp_replace(lower(coalesce(text, '')),
                    '[^a-z0-9 ]+', ' ', 'g'), ' +', ' ', 'g')) AS norm_text
        FROM documents"""


def token_entropy(sf_dir: str):
    """Per-document Shannon entropy of the token distribution (nats) — the
    information-theoretic quality axis alongside :func:`repetition_scores`
    (low entropy ⇔ repetitive/templated text; Gopher-family signal).

    Per-doc only ⇒ zero shuffle; one vectorized explode per batch and the
    identity ``H = ln(n) − (Σ c·ln c)/n`` so no per-token probability column
    materializes."""

    def scores(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].fillna("").str.split()
        n = toks.str.len().to_numpy(np.int64)
        doc = np.repeat(np.arange(len(df)), n)
        flat = np.concatenate([*toks, np.array([], dtype=object)])
        h = np.zeros(len(df), np.float64)
        if len(flat):
            c = pd.DataFrame({"d": doc, "w": flat}) \
                .groupby(["d", "w"]).size()
            cv = c.to_numpy(np.float64)
            clogc = pd.Series(cv * np.log(cv),
                              index=c.index.get_level_values("d")) \
                .groupby(level=0).sum()
            nz = n > 0
            acc = np.zeros(len(df), np.float64)
            acc[clogc.index.to_numpy()] = clogc.to_numpy()
            h[nz] = np.log(n[nz]) - acc[nz] / n[nz]
        from ..functions.rounding import round_half_away as _r

        return pd.DataFrame({"doc_id": df["doc_id"].to_numpy(np.int64),
                             "entropy": _r(h, 6)})

    return ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text"]) \
        .map_batches(scores, batch_format="pandas", batch_size=2048)


def token_entropy_oracle_sql() -> str:
    return """
        WITH base AS (
            SELECT doc_id, list_filter(
                regexp_split_to_array(coalesce(text, ''), '\\s+'),
                x -> x <> '') AS l
            FROM documents),
        tk AS (SELECT doc_id, l[i] AS tok
               FROM base, UNNEST(generate_series(1, len(l))) AS t(i)),
        c AS (SELECT doc_id, tok, count(*) AS c FROM tk GROUP BY 1, 2),
        agg AS (SELECT doc_id, sum(c) AS n, sum(c * ln(c)) AS clogc
                FROM c GROUP BY doc_id)
        SELECT base.doc_id,
               round(coalesce(ln(n) - clogc / n, 0.0), 6) AS entropy
        FROM base LEFT JOIN agg USING (doc_id)"""


def chunk_documents(sf_dir: str, chunk_tokens: int = 32):
    """Split every document into consecutive ``chunk_tokens``-token chunks
    (the RAG / training-prep chunking step; normalized single-space join,
    trailing partial chunk kept).  Entirely per-document ⇒ NO shuffle: one
    vectorized token explode per batch, chunk id = token_pos //
    chunk_tokens, per-chunk text via a grouped join.  Exact DuckDB oracle
    (generate_series step slicing) in queries.oracle_sql."""
    if chunk_tokens < 1:
        raise ValueError("chunk_tokens must be >= 1")

    def chunks(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].fillna("").str.split()
        n = toks.str.len().to_numpy(np.int64)
        doc = np.repeat(np.arange(len(df)), n)
        flat = np.concatenate([*toks, np.array([], dtype=object)]) \
            .astype(object)
        cum0 = np.concatenate([[0], np.cumsum(n)[:-1]])
        pos = np.arange(len(flat), dtype=np.int64) - np.repeat(cum0, n)
        tk = pd.DataFrame({"d": doc, "c": pos // chunk_tokens, "w": flat})
        agg = tk.groupby(["d", "c"], sort=True)["w"] \
            .agg([("text", " ".join), ("n_tokens", "size")]).reset_index()
        return pd.DataFrame({
            "doc_id": df["doc_id"].to_numpy(np.int64)[agg["d"].to_numpy()],
            "chunk_idx": agg["c"].to_numpy(np.int64),
            "text": agg["text"].to_numpy(),
            "n_tokens": agg["n_tokens"].to_numpy(np.int64)})

    return ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text"]) \
        .map_batches(chunks, batch_format="pandas", batch_size=4096)


def chunk_documents_oracle_sql(chunk_tokens: int = 32) -> str:
    c = chunk_tokens
    return f"""
        WITH tk AS (SELECT doc_id,
                           list_filter(regexp_split_to_array(
                               coalesce(text, ''), '\\s+'), x -> x <> '') AS l
                    FROM documents)
        SELECT doc_id, CAST((i - 1) // {c} AS BIGINT) AS chunk_idx,
               array_to_string(list_slice(l, i, least(i + {c} - 1, len(l))),
                               ' ') AS text,
               CAST(least(i + {c} - 1, len(l)) - i + 1 AS BIGINT) AS n_tokens
        FROM tk, UNNEST(generate_series(1, len(l), {c})) AS t(i)
        WHERE len(l) >= 1"""


def bm25_topk(sf_dir: str, k: int = 10, n_queries: int = 5,
              terms_per_query: int = 3, k1: float = 1.2, b: float = 0.75):
    """BM25 top-``k`` retrieval (Robertson/Lucene idf variant) over the
    documents table — the sparse-retrieval complement to the dense ANN
    family (``similarity.py``): keyword search over 100 TB of text is a
    broadcast-scored scan, not an index lookup, until a posting-list layout
    is justified.

    Query sets are DERIVED deterministically from the corpus (the top
    ``n_queries × terms_per_query`` document-frequency terms, dealt
    round-robin so each query mixes high- and mid-df terms) — meaningful at
    every scale factor, and the oracle derives the identical sets in SQL.

    Scale shape: pass 1 computes per-term document frequencies (per-batch
    distinct partials → vocabulary-bounded groupby) plus corpus token count
    (one scalar per batch riding the same shuffle); only the ≤ nq·tpq query
    terms broadcast via ``ray.put``.  Pass 2 scores each batch's docs against
    ALL queries vectorized (tokens filtered to query terms with ``isin``,
    one merge, one grouped sum) and emits a per-batch top-k partial per
    query, so the driver merge sees ≤ batches × nq × k narrow rows — the
    text never shuffles.  Ranking uses the ROUNDED score (6 dp) in both
    engine and oracle so the cutoff is float-stable."""
    import ray

    from ray.data.aggregate import Sum

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
    empty = pd.DataFrame({"query_id": pd.Series([], dtype=np.int64),
                          "rank": pd.Series([], dtype=np.int64),
                          "doc_id": pd.Series([], dtype=np.int64),
                          "score": pd.Series([], dtype=float)})
    n_docs = int(ds.count())
    if n_docs == 0:
        return empty

    def df_partial(df: pd.DataFrame) -> pa.Table:
        toks = _token_lists(df["text"])
        ex = toks.explode().dropna()
        pairs = pd.DataFrame({"doc": ex.index, "term": ex.to_numpy()}) \
            .drop_duplicates()
        vc = pairs["term"].value_counts()
        ptoks = np.zeros(len(vc), np.int64)
        if len(ptoks):
            ptoks[0] = len(ex)  # batch token count rides the df shuffle once
        return pa.table({"term": pa.array(vc.index.astype(str)),
                         "partial_df": pa.array(vc.to_numpy(np.int64)),
                         "partial_toks": pa.array(ptoks)})

    dfs = ds.map_batches(df_partial, batch_format="pandas") \
        .groupby("term").aggregate(
            Sum("partial_df", alias_name="doc_freq"),
            Sum("partial_toks", alias_name="toks")).to_pandas()
    if not len(dfs) or not len(dfs.columns):
        return empty
    total_toks = int(dfs["toks"].sum())
    avgdl = total_toks / n_docs
    if avgdl == 0.0:
        return empty

    nq_terms = n_queries * terms_per_query
    sel = dfs.sort_values(["doc_freq", "term"], ascending=[False, True],
                          kind="mergesort").head(nq_terms).reset_index(drop=True)
    sel["query_id"] = np.arange(len(sel), dtype=np.int64) % n_queries
    qref = ray.put(sel[["term", "doc_freq", "query_id"]])

    def score_batch(df: pd.DataFrame) -> pd.DataFrame:
        import ray as _ray

        q = _ray.get(qref)
        toks = _token_lists(df["text"])
        dl = toks.str.len().to_numpy(np.int64)
        ex = toks.explode().dropna()
        pairs = pd.DataFrame({"row": ex.index, "term": ex.to_numpy()})
        pairs = pairs[pairs["term"].isin(q["term"])]
        if not len(pairs):
            return pd.DataFrame({"query_id": pd.Series([], dtype=np.int64),
                                 "doc_id": pd.Series([], dtype=np.int64),
                                 "score": pd.Series([], dtype=float)})
        tf = pairs.groupby(["row", "term"], sort=False).size() \
            .reset_index(name="tf").merge(q, on="term")
        row_pos = df.index.get_indexer(tf["row"])
        tfv = tf["tf"].to_numpy(np.float64)
        dfv = tf["doc_freq"].to_numpy(np.float64)
        dlv = dl[row_pos].astype(np.float64)
        idf = np.log((n_docs - dfv + 0.5) / (dfv + 0.5) + 1.0)
        part = idf * (tfv * (k1 + 1)) / (tfv + k1 * (1 - b + b * dlv / avgdl))
        hits = pd.DataFrame({
            "query_id": tf["query_id"].to_numpy(np.int64),
            "doc_id": df["doc_id"].to_numpy(np.int64)[row_pos],
            "part": part})
        sc = hits.groupby(["query_id", "doc_id"], sort=False)["part"].sum() \
            .reset_index(name="score")
        sc["score"] = round_half_away(sc["score"].to_numpy(np.float64), 6)
        sc = sc.sort_values(["query_id", "score", "doc_id"],
                            ascending=[True, False, True], kind="mergesort")
        top = sc.groupby("query_id", sort=False).head(k)
        return top[["query_id", "doc_id", "score"]].reset_index(drop=True)

    partials = ds.map_batches(score_batch, batch_format="pandas",
                              batch_size=4096).to_pandas()
    if not len(partials) or "score" not in partials.columns:
        return empty
    partials = partials.sort_values(["query_id", "score", "doc_id"],
                                    ascending=[True, False, True],
                                    kind="mergesort")
    out = partials.groupby("query_id", sort=True).head(k).reset_index(drop=True)
    out["rank"] = out.groupby("query_id", sort=False).cumcount() + 1
    return out[["query_id", "rank", "doc_id", "score"]]


def bm25_topk_oracle_sql(k: int = 10, n_queries: int = 5,
                         terms_per_query: int = 3, k1: float = 1.2,
                         b: float = 0.75) -> str:
    nqt = n_queries * terms_per_query
    return f"""
        WITH toks AS (
            SELECT doc_id, unnest(list_filter(
                regexp_split_to_array(coalesce(text, ''), '\\s+'),
                x -> x <> '')) AS term
            FROM documents),
        tf AS (SELECT doc_id, term, count(*) AS tf
               FROM toks GROUP BY doc_id, term),
        dfreq AS (SELECT term, count(DISTINCT doc_id) AS doc_freq
                  FROM toks GROUP BY term),
        dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
        stats AS (SELECT (SELECT count(*) FROM documents) AS n_docs,
                         CAST((SELECT count(*) FROM toks) AS DOUBLE)
                             / (SELECT count(*) FROM documents) AS avgdl),
        qsel AS (SELECT term, doc_freq,
                        row_number() OVER (ORDER BY doc_freq DESC, term ASC)
                            AS rn
                 FROM dfreq QUALIFY rn <= {nqt}),
        qterms AS (SELECT term, doc_freq,
                          CAST((rn - 1) % {n_queries} AS BIGINT) AS query_id
                   FROM qsel),
        scored AS (
            SELECT q.query_id, tf.doc_id,
                   round(sum(
                       ln((s.n_docs - q.doc_freq + 0.5)
                          / (q.doc_freq + 0.5) + 1.0)
                       * (tf.tf * ({k1} + 1))
                       / (tf.tf + {k1} * (1 - {b}
                                          + {b} * dl.dl / s.avgdl))), 6)
                       AS score
            FROM tf
            JOIN qterms q USING (term)
            JOIN dl USING (doc_id)
            CROSS JOIN stats s
            GROUP BY q.query_id, tf.doc_id)
        SELECT query_id,
               CAST(row_number() OVER (PARTITION BY query_id
                        ORDER BY score DESC, doc_id ASC) AS BIGINT) AS rank,
               doc_id, score
        FROM scored QUALIFY rank <= {k}"""


def hybrid_topk_rrf(sf_dir: str, k: int = 10, n_queries: int = 5,
                    pool: int = 20, kappa: float = 60.0,
                    terms_per_query: int = 3):
    """Hybrid retrieval by RECIPROCAL RANK FUSION (Cormack et al., the
    standard sparse+dense combiner in RAG stacks): fuse the BM25 ranking
    (:func:`bm25_topk`) and the exact-cosine dense ranking
    (:func:`..pipelines.similarity.ann_topk`) over the SAME corpus
    (``doc_id == vec_id`` by table construction) —
    ``rrf(d) = 1/(κ+rank_sparse(d)) + 1/(κ+rank_dense(d))`` over the union
    of both ``pool``-deep lists; a doc absent from one list simply gets no
    contribution from it.  BM25 query ``j`` fuses with the dense query
    whose vec_id is the ``j``-th smallest (both workloads are
    deterministic and corpus-derived, so the pairing is stable at every
    scale factor and replayable in SQL).

    Scale shape: both constituent retrievers are single distributed scans
    with O(pool × queries × blocks) driver merges (their own docstrings);
    the fusion itself touches only 2·n_queries·pool rows on the driver.
    Ranking uses the ROUNDED rrf (9 dp) in engine and oracle so the
    cutoff is float-stable."""
    from .similarity import _load_queries, ann_topk

    sparse = bm25_topk(sf_dir, k=pool, n_queries=n_queries,
                       terms_per_query=terms_per_query)
    dense = ann_topk(sf_dir, n_queries=n_queries, k=pool)
    empty = pd.DataFrame({"query_id": pd.Series([], dtype=np.int64),
                          "rank": pd.Series([], dtype=np.int64),
                          "doc_id": pd.Series([], dtype=np.int64),
                          "rrf": pd.Series([], dtype=np.float64)})
    if not len(sparse) and not len(dense):
        return empty
    # dense ranks: ann_topk's output order IS its ranking order
    # (cos desc, vec_id asc — proven oracle-exact); remap its vec_id
    # query ids onto bm25's 0..n-1 space via the deterministic query list
    dense = dense.copy()
    dense["rank"] = dense.groupby("query_id", sort=False).cumcount() + 1
    qv, _ = _load_queries(sf_dir, n_queries)  # ascending vec_ids
    pos = {int(v): i for i, v in enumerate(qv)}
    dense["query_id"] = dense["query_id"].map(pos).astype(np.int64)
    dense = dense.rename(columns={"vec_id": "doc_id"})
    both = pd.merge(sparse[["query_id", "doc_id", "rank"]],
                    dense[["query_id", "doc_id", "rank"]],
                    on=["query_id", "doc_id"], how="outer",
                    suffixes=("_s", "_d"))
    rs = both["rank_s"].to_numpy(np.float64)
    rd = both["rank_d"].to_numpy(np.float64)
    rrf = (np.where(np.isnan(rs), 0.0, 1.0 / (kappa + rs))
           + np.where(np.isnan(rd), 0.0, 1.0 / (kappa + rd)))
    both["rrf"] = round_half_away(rrf, 9)
    both = both.sort_values(["query_id", "rrf", "doc_id"],
                            ascending=[True, False, True], kind="mergesort")
    out = both.groupby("query_id", sort=False).head(k).reset_index(drop=True)
    out["rank"] = out.groupby("query_id", sort=False).cumcount() + 1
    return pd.DataFrame({
        "query_id": out["query_id"].to_numpy(np.int64),
        "rank": out["rank"].to_numpy(np.int64),
        "doc_id": out["doc_id"].to_numpy(np.int64),
        "rrf": out["rrf"].to_numpy(np.float64)})


def hybrid_topk_rrf_oracle_sql(k: int = 10, n_queries: int = 5,
                               pool: int = 20, kappa: float = 60.0,
                               terms_per_query: int = 3) -> str:
    sparse = bm25_topk_oracle_sql(k=pool, n_queries=n_queries,
                                  terms_per_query=terms_per_query)
    return f"""
        WITH sp AS (SELECT query_id, doc_id, rank FROM ({sparse})),
        ed AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
               FROM embeddings),
        q AS (SELECT vec_id AS qvid,
                     CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT)
                         AS query_id,
                     emb AS qe
              FROM ed ORDER BY vec_id LIMIT {n_queries}),
        dn AS (
            SELECT query_id, vec_id AS doc_id,
                   CAST(row_number() OVER (
                       PARTITION BY query_id
                       ORDER BY sim DESC, vec_id ASC) AS BIGINT) AS rank
            FROM (SELECT q.query_id, e.vec_id,
                         list_cosine_similarity(q.qe, e.emb) AS sim
                  FROM q, ed e WHERE e.vec_id <> q.qvid)
            QUALIFY rank <= {pool}),
        fused AS (
            SELECT coalesce(sp.query_id, dn.query_id) AS query_id,
                   coalesce(sp.doc_id, dn.doc_id) AS doc_id,
                   round(coalesce(1.0 / ({kappa} + sp.rank), 0.0)
                         + coalesce(1.0 / ({kappa} + dn.rank), 0.0), 9)
                       AS rrf
            FROM sp FULL OUTER JOIN dn
                 ON sp.query_id = dn.query_id AND sp.doc_id = dn.doc_id)
        SELECT query_id,
               CAST(row_number() OVER (PARTITION BY query_id
                        ORDER BY rrf DESC, doc_id ASC) AS BIGINT) AS rank,
               doc_id, rrf
        FROM fused QUALIFY rank <= {k}"""


def ngram_diversity(sf_dir: str, n: int = 3, num_partitions: int = 16):
    """Distinct-n corpus-diversity diagnostic (Li et al.'s distinct-n,
    standard for detecting template/boilerplate-heavy sources): per source,
    ``distinct n-grams / total n-grams`` — a low ratio flags a source whose
    text repeats itself (mirror dumps, log spam) before it poisons a
    training mix.

    Scale shape: totals per source are a bounded driver fold; the distinct
    count shuffles each batch's DISTINCT (source, gram) pairs ONCE, hashed
    by gram into ``num_partitions`` groups whose per-partition
    distinct-per-source counts are again a bounded fold — the exchange
    scales with the n-gram vocabulary (the honest cost of an exact
    distinct), the driver only ever sees O(sources × partitions) rows.
    Vectorized gram construction (shifted-array join, no Python loop over
    rows)."""
    from .relational import _merge_bounded_partials

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["source", "text"])

    def _grams(df: pd.DataFrame) -> tuple[np.ndarray, np.ndarray]:
        """(source, gram) arrays for every within-doc n-gram of the batch."""
        toks = _token_lists(df["text"])
        ex = toks.explode().dropna()
        if len(ex) < n:
            return (np.array([], object), np.array([], object))
        tok = ex.to_numpy()
        doc = ex.index.to_numpy()
        same = doc[: len(doc) - n + 1] == doc[n - 1:]
        if not same.any():
            return (np.array([], object), np.array([], object))
        parts = pd.Series(tok[: len(tok) - n + 1])
        for off in range(1, n):
            parts = parts + " " + pd.Series(
                tok[off: len(tok) - n + 1 + off])
        grams = parts.to_numpy()[same]
        src = df["source"].fillna("").to_numpy(object)[
            df.index.get_indexer(ex.index[: len(doc) - n + 1][same])]
        return (src, grams)

    def total_partial(df: pd.DataFrame) -> pd.DataFrame:
        src, grams = _grams(df)
        if not len(grams):
            return pd.DataFrame({"source": pd.Series([], dtype=object),
                                 "partial_total": pd.Series([], dtype=np.int64)})
        vc = pd.Series(src).value_counts()
        return pd.DataFrame({"source": vc.index.to_numpy(object),
                             "partial_total": vc.to_numpy(np.int64)})

    totals = _merge_bounded_partials(
        ds.map_batches(total_partial, batch_format="pandas"),
        keys=["source"], sums={"partial_total": "total"})
    if totals is None:
        return pd.DataFrame({"source": pd.Series([], dtype=object),
                             "total_ngrams": pd.Series([], dtype=np.int64),
                             "distinct_ngrams": pd.Series([], dtype=np.int64),
                             "diversity": pd.Series([], dtype=np.float64)})

    def pair_partial(df: pd.DataFrame) -> pd.DataFrame:
        src, grams = _grams(df)
        out = pd.DataFrame({"source": src, "gram": grams}).drop_duplicates()
        h = pd.util.hash_pandas_object(out["gram"], index=False).to_numpy()
        out["part"] = (h % num_partitions).astype(np.int32)
        return out

    def distinct_in_part(g: pd.DataFrame) -> pd.DataFrame:
        d = g.drop_duplicates(["source", "gram"])["source"].value_counts()
        return pd.DataFrame({"source": d.index.to_numpy(object),
                             "partial_distinct": d.to_numpy(np.int64)})

    distinct = _merge_bounded_partials(
        ds.map_batches(pair_partial, batch_format="pandas")
        .groupby("part").map_groups(distinct_in_part, batch_format="pandas"),
        keys=["source"], sums={"partial_distinct": "distinct"})

    out = totals.merge(distinct, on="source", how="left")
    out["distinct"] = out["distinct"].fillna(0).astype(np.int64)
    out["diversity"] = round_half_away(
        out["distinct"].to_numpy(np.float64)
        / out["total"].to_numpy(np.float64), 6)
    out = out.rename(columns={"total": "total_ngrams",
                              "distinct": "distinct_ngrams"})
    return out[["source", "total_ngrams", "distinct_ngrams", "diversity"]] \
        .sort_values("source").reset_index(drop=True)


def ngram_diversity_oracle_sql(n: int = 3) -> str:
    return f"""
        WITH tk AS (SELECT coalesce(source, '') AS source,
                           list_filter(regexp_split_to_array(
                               coalesce(text, ''), '\\s+'),
                               x -> x <> '') AS l
                    FROM documents),
        g AS (SELECT source,
                     array_to_string(list_slice(l, i, i + {n} - 1), ' ')
                         AS gram
              FROM tk, UNNEST(generate_series(1, len(l) - {n} + 1)) AS t(i)
              WHERE len(l) >= {n})
        SELECT source,
               count(*) AS total_ngrams,
               count(DISTINCT gram) AS distinct_ngrams,
               round(CAST(count(DISTINCT gram) AS DOUBLE) / count(*), 6)
                   AS diversity
        FROM g GROUP BY source"""


def dsir_weights(sf_dir: str, target_lang: str = "en", buckets: int = 1024):
    """DSIR-style hashed importance weights (Xie et al. 2023, "Data
    Selection for Language Models via Importance Resampling" — public
    method): score every document by the log-likelihood ratio of its
    hashed unigram features under the TARGET distribution (docs with
    ``lang == target_lang``) vs the RAW distribution (all docs), add-one
    smoothed over a fixed ``buckets``-sized hashed feature space.  The
    hashing is the point at 100 TB: the sufficient statistic is O(buckets)
    regardless of vocabulary growth, where a term-level table (tf-idf /
    surprisal style) grows with the corpus.

    Scale shape: pass 1 folds (bucket → target/raw token counts) — a
    ≤ ``buckets``-row partial stream per batch — on the driver via the
    shared streamed fold (no AllToAll); the 9-dp-rounded log-ratio table
    broadcasts ONCE via ``ray.put`` (8 KiB at the default size); pass 2
    re-scans, md5-hashes each batch's UNIQUE tokens (factorize-first, the
    repo's SQL-replayable hash discipline — functions/hashing.py), and
    sums rounded ratios per doc.  The output rounds to 6 dp so
    summation-order noise between numpy and the SQL replay (~1e-13 on
    9-dp-rounded addends) cannot flip the value hash.  Downstream
    resampling = the existing weighted-sampling operators over the
    returned ``weight`` column."""
    from ..functions.hashing import md5_u32
    from .relational import _merge_bounded_partials

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text", "lang"])
    empty = pd.DataFrame({"doc_id": pd.Series([], dtype=np.int64),
                          "weight": pd.Series([], dtype=np.float64)})

    def count_partial(df: pd.DataFrame) -> pd.DataFrame:
        ex = _token_lists(df["text"]).explode().dropna()
        if not len(ex):
            return pd.DataFrame({"bucket": pd.Series([], dtype=np.int64),
                                 "t_n": pd.Series([], dtype=np.int64),
                                 "r_n": pd.Series([], dtype=np.int64)})
        codes, uniq = pd.factorize(ex.to_numpy())
        b = (md5_u32(uniq) % buckets).astype(np.int64)[codes]
        row_pos = df.index.get_indexer(ex.index)
        is_t = (df["lang"].to_numpy(object) == target_lang)[row_pos]
        return pd.DataFrame({"bucket": b,
                             "t_n": is_t.astype(np.int64),
                             "r_n": np.ones(len(b), np.int64)}) \
            .groupby("bucket", as_index=False).sum()

    cnt = _merge_bounded_partials(
        ds.map_batches(count_partial, batch_format="pandas"),
        keys=["bucket"], sums={"t_n": "t", "r_n": "r"})
    if cnt is None:
        return empty
    T = int(cnt["t"].sum())
    R = int(cnt["r"].sum())
    lr_arr = np.zeros(buckets, np.float64)  # unseen buckets: never probed
    t = cnt["t"].to_numpy(np.float64)
    r = cnt["r"].to_numpy(np.float64)
    lr = np.log(((t + 1.0) / (T + buckets)) / ((r + 1.0) / (R + buckets)))
    lr_arr[cnt["bucket"].to_numpy(np.int64)] = round_half_away(lr, 9)
    ref = ray.put(lr_arr)

    def score(df: pd.DataFrame) -> pd.DataFrame:
        import ray as _ray

        lrv = _ray.get(ref)
        ex = _token_lists(df["text"]).explode().dropna()
        w = np.zeros(len(df), np.float64)
        if len(ex):
            codes, uniq = pd.factorize(ex.to_numpy())
            per_tok = lrv[(md5_u32(uniq) % buckets).astype(np.int64)][codes]
            w = np.bincount(df.index.get_indexer(ex.index),
                            weights=per_tok, minlength=len(df))
        return pd.DataFrame({"doc_id": df["doc_id"].to_numpy(np.int64),
                             "weight": round_half_away(w, 6)})

    out = ds.map_batches(score, batch_format="pandas").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def dsir_weights_oracle_sql(target_lang: str = "en",
                            buckets: int = 1024) -> str:
    return f"""
        WITH toks AS (
            SELECT doc_id, lang, unnest(list_filter(
                regexp_split_to_array(coalesce(text, ''), '\\s+'),
                x -> x <> '')) AS term
            FROM documents),
        h AS (SELECT doc_id, lang,
                     ('0x' || substring(md5(term), 1, 8))::BIGINT
                         % {buckets} AS b
              FROM toks),
        cnt AS (SELECT b,
                       count(*) FILTER (WHERE lang = '{target_lang}') AS t,
                       count(*) AS r
                FROM h GROUP BY b),
        tot AS (SELECT sum(t) AS tt, sum(r) AS rr FROM cnt),
        ratio AS (SELECT b,
                         round(ln(((t + 1.0) / (tt + {buckets}))
                                  / ((r + 1.0) / (rr + {buckets}))), 9)
                             AS lr
                  FROM cnt CROSS JOIN tot),
        dw AS (SELECT h.doc_id, sum(ratio.lr) AS w
               FROM h JOIN ratio USING (b) GROUP BY h.doc_id)
        SELECT d.doc_id, round(coalesce(dw.w, 0.0), 6) AS weight
        FROM documents d LEFT JOIN dw USING (doc_id)"""


def bm25_build_index(sf_dir: str, index_dir: str, num_buckets: int = 32):
    """One-time inverted-index build for :func:`bm25_topk_indexed`.

    Layout (all hive-partitioned by ``bucket = stable_hash(term) % B`` so a
    query touches only its terms' directories):

    - ``postings/bucket={b}/`` — (term, doc_id, tf, dl) posting rows with
      the document length DENORMALIZED in, so query-time scoring needs no
      doc-side lookup;
    - ``df/bucket={b}/`` — (term, doc_freq) per-term document frequencies;
    - ``meta.json`` — n_docs / total_tokens (the global scalars).

    The corpus text is scanned exactly ONCE (build); queries afterwards
    read 8-to-24-byte posting rows for pruned buckets only.  Per-bucket
    writes inherit :func:`..sinks.batch.write_hive_partitioned`'s
    one-task-per-key materialization — at 100 TB raise ``num_buckets`` (or
    swap in the hash-shard sink) so a bucket fits a worker heap."""
    import json as _json
    import os

    import ray

    from ray.data.aggregate import Sum

    from ..sinks.batch import write_hive_partitioned
    from ..stages.partition import stable_hash

    done = os.path.join(index_dir, "_DONE")
    if os.path.exists(done):
        with open(os.path.join(index_dir, "meta.json")) as f:
            return _json.load(f)
    os.makedirs(index_dir, exist_ok=True)

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
    n_docs = int(ds.count())

    def posting_rows(df: pd.DataFrame) -> pd.DataFrame:
        toks = _token_lists(df["text"])
        dl = toks.str.len().to_numpy(np.int64)
        ex = toks.explode().dropna()
        if not len(ex):
            return pd.DataFrame({
                "bucket": pd.Series([], dtype=np.int64),
                "term": pd.Series([], dtype=str),
                "doc_id": pd.Series([], dtype=np.int64),
                "tf": pd.Series([], dtype=np.int64),
                "dl": pd.Series([], dtype=np.int64)})
        row_pos = df.index.get_indexer(ex.index)
        g = pd.DataFrame({"doc_id": df["doc_id"].to_numpy(np.int64)[row_pos],
                          "dl": dl[row_pos], "term": ex.to_numpy()}) \
            .groupby(["doc_id", "dl", "term"], sort=False).size() \
            .reset_index(name="tf")
        g["bucket"] = (stable_hash(g["term"]) % num_buckets).astype(np.int64)
        return g[["bucket", "term", "doc_id", "tf", "dl"]]

    postings = ds.map_batches(posting_rows, batch_format="pandas",
                              batch_size=4096)
    write_hive_partitioned(postings, os.path.join(index_dir, "postings"),
                           by="bucket")

    def df_partial(df: pd.DataFrame) -> pd.DataFrame:
        toks = _token_lists(df["text"])
        ex = toks.explode().dropna()
        pairs = pd.DataFrame({"doc": ex.index, "term": ex.to_numpy()}) \
            .drop_duplicates()
        vc = pairs["term"].value_counts()
        ptoks = np.zeros(len(vc), np.int64)
        if len(ptoks):
            ptoks[0] = len(ex)
        return pd.DataFrame({"term": vc.index.astype(str),
                             "partial_df": vc.to_numpy(np.int64),
                             "partial_toks": ptoks})

    dfs = ds.map_batches(df_partial, batch_format="pandas") \
        .groupby("term").aggregate(
            Sum("partial_df", alias_name="doc_freq"),
            Sum("partial_toks", alias_name="toks"))

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["bucket"] = (stable_hash(df["term"]) % num_buckets).astype(np.int64)
        return df

    write_hive_partitioned(dfs.map_batches(add_bucket, batch_format="pandas"),
                           os.path.join(index_dir, "df"), by="bucket")
    total_toks = int(dfs.to_pandas()["toks"].sum()) if n_docs else 0
    meta = {"n_docs": n_docs, "total_toks": total_toks,
            "num_buckets": num_buckets}
    with open(os.path.join(index_dir, "meta.json"), "w") as f:
        _json.dump(meta, f)
    with open(done, "w") as f:
        f.write("ok")
    return meta


def bm25_topk_indexed(sf_dir: str, index_dir: str | None = None,
                      k: int = 10, n_queries: int = 5,
                      terms_per_query: int = 3, k1: float = 1.2,
                      b: float = 0.75):
    """Tmpdir-lifecycle wrapper over :func:`_bm25_topk_indexed_run`: when no
    ``index_dir`` is given the index is built in a mkdtemp directory and
    removed afterwards (mirrors ann_topk_pq_indexed / the roundtrip
    queries — a default invocation must not leak a full inverted index)."""
    import shutil
    import tempfile

    own_tmp = index_dir is None
    if own_tmp:
        index_dir = tempfile.mkdtemp(prefix="pwr_bm25_")
    try:
        return _bm25_topk_indexed_run(sf_dir, index_dir, k=k,
                                      n_queries=n_queries,
                                      terms_per_query=terms_per_query,
                                      k1=k1, b=b)
    finally:
        if own_tmp:
            shutil.rmtree(index_dir, ignore_errors=True)


def _bm25_topk_indexed_run(sf_dir: str, index_dir: str,
                           k: int = 10, n_queries: int = 5,
                           terms_per_query: int = 3, k1: float = 1.2,
                           b: float = 0.75):
    """BM25 over the PERSISTED inverted index: identical results to
    :func:`bm25_topk` (same oracle), different cost shape — the corpus text
    is never rescanned.  Query terms map to hash buckets; ONLY those
    ``postings/bucket={b}/`` directories are read (physical pruning via the
    hive layout), filtered to the exact terms, scored vectorized, and the
    per-(query, doc) partials merge through one narrow groupby before the
    per-batch top-k partials reach the driver.  This is the 100 TB shape:
    per query set, bytes read scale with the query terms' posting lists,
    not the corpus."""
    import os

    import ray

    from ray.data.aggregate import Sum

    from ..sinks.batch import read_hive_partitioned
    from ..stages.partition import stable_hash

    empty = pd.DataFrame({"query_id": pd.Series([], dtype=np.int64),
                          "rank": pd.Series([], dtype=np.int64),
                          "doc_id": pd.Series([], dtype=np.int64),
                          "score": pd.Series([], dtype=float)})
    meta = bm25_build_index(sf_dir, index_dir)
    n_docs, total_toks = meta["n_docs"], meta["total_toks"]
    num_buckets = meta["num_buckets"]
    if n_docs == 0 or total_toks == 0:
        return empty
    avgdl = total_toks / n_docs

    # query-set derivation — identical ordering to bm25_topk (df desc,
    # term asc, round-robin deal); the df table is vocabulary-bounded
    dfs = read_hive_partitioned(os.path.join(index_dir, "df"), "bucket") \
        .to_pandas()
    nq_terms = n_queries * terms_per_query
    sel = dfs.sort_values(["doc_freq", "term"], ascending=[False, True],
                          kind="mergesort").head(nq_terms).reset_index(drop=True)
    sel["query_id"] = np.arange(len(sel), dtype=np.int64) % n_queries
    qref = ray.put(sel[["term", "doc_freq", "query_id"]])

    buckets = sorted(set((stable_hash(sel["term"]) % num_buckets).tolist()))
    posts = read_hive_partitioned(os.path.join(index_dir, "postings"),
                                  "bucket", values=buckets)

    def score_postings(df: pd.DataFrame) -> pd.DataFrame:
        import ray as _ray

        q = _ray.get(qref)
        df = df.merge(q, on="term")  # pruned bucket still holds other terms
        if not len(df):
            return pd.DataFrame({"query_id": pd.Series([], dtype=np.int64),
                                 "doc_id": pd.Series([], dtype=np.int64),
                                 "part": pd.Series([], dtype=float)})
        tfv = df["tf"].to_numpy(np.float64)
        dfv = df["doc_freq"].to_numpy(np.float64)
        dlv = df["dl"].to_numpy(np.float64)
        idf = np.log((n_docs - dfv + 0.5) / (dfv + 0.5) + 1.0)
        part = idf * (tfv * (k1 + 1)) / (tfv + k1 * (1 - b + b * dlv / avgdl))
        return pd.DataFrame({"query_id": df["query_id"].to_numpy(np.int64),
                             "doc_id": df["doc_id"].to_numpy(np.int64),
                             "part": part})

    scored = posts.map_batches(score_postings, batch_format="pandas",
                               batch_size=8192) \
        .groupby(["query_id", "doc_id"]) \
        .aggregate(Sum("part", alias_name="score"))

    def topk_partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["score"] = round_half_away(df["score"].to_numpy(np.float64), 6)
        df = df.sort_values(["query_id", "score", "doc_id"],
                            ascending=[True, False, True], kind="mergesort")
        return df.groupby("query_id", sort=False).head(k) \
            [["query_id", "doc_id", "score"]]

    partials = scored.map_batches(topk_partial, batch_format="pandas") \
        .to_pandas()
    if not len(partials) or "score" not in partials.columns:
        return empty
    partials = partials.sort_values(["query_id", "score", "doc_id"],
                                    ascending=[True, False, True],
                                    kind="mergesort")
    out = partials.groupby("query_id", sort=True).head(k).reset_index(drop=True)
    out["rank"] = out.groupby("query_id", sort=False).cumcount() + 1
    return out[["query_id", "rank", "doc_id", "score"]]


def quality_percentile_filter(sf_dir: str, q: float = 0.5):
    """DYNAMIC-threshold corpus filter: keep each document at or above its
    OWN SOURCE's q-th percentile of length — the data-dependent cousin of
    the fixed-threshold :func:`quality_filter` (per-source thresholds adapt
    to each source's distribution, the usual way web-corpus cuts are set).

    Two-phase shape that holds at 10^12 docs: phase 1 computes the exact
    per-source percentile as a distributed value-counts rollup (shuffle
    moves DISTINCT (source, n_chars) pairs, domain-bounded — see
    ``relational.quantile_rollup``); phase 2 broadcasts the |sources|-row
    threshold table via ``ray.put`` and filters the scan vectorized.  The
    corpus crosses the cluster once, thresholds never shuffle."""
    import ray

    from .relational import quantile_rollup

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "source", "n_chars"])
    th = quantile_rollup(ds, "source", "n_chars", (q,),
                         suffix="n_chars").to_pandas()
    empty = pd.DataFrame({"doc_id": pd.Series([], dtype=np.int64),
                          "source": pd.Series([], dtype=str),
                          "n_chars": pd.Series([], dtype=np.int64)})
    if not len(th) or not len(th.columns):
        return empty
    col = f"p{int(round(q * 100))}_n_chars"
    th = th.sort_values("source")
    ref = ray.put((th["source"].to_numpy().astype(str),
                   th[col].to_numpy(np.int64)))

    def keep(t: pa.Table) -> pa.Table:
        srcs, cuts = ray.get(ref)
        sv = t["source"].to_numpy(zero_copy_only=False).astype(str)
        nc = t["n_chars"].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(srcs, sv).clip(max=max(len(srcs) - 1, 0))
        hit = (srcs[pos] == sv) if len(srcs) else np.zeros(len(sv), bool)
        mask = hit & (nc >= cuts[pos] if len(srcs) else False)
        return t.filter(pa.array(mask))

    return ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)


def quality_percentile_filter_oracle_sql(q: float = 0.5) -> str:
    return f"""
        WITH th AS (SELECT source, quantile_disc(n_chars, {q}) AS cut
                    FROM documents
                    WHERE source IS NOT NULL AND n_chars IS NOT NULL
                    GROUP BY source)
        SELECT d.doc_id, d.source, d.n_chars
        FROM documents d JOIN th ON th.source = d.source
        WHERE d.n_chars >= th.cut"""

def token_cooccurrence(sf_dir: str, window: int = 3, k: int = 30,
                       num_partitions: int = 16):
    """Corpus-level skip-gram co-occurrence: the ``k`` most frequent
    UNORDERED token pairs within ``window`` positions of each other — the
    counting core of PMI / word2vec-style association statistics
    (generalizes :func:`top_bigrams`, which is the ``window=1`` ordered
    case).

    Fully vectorized: one exploded token array per batch with doc-boundary
    masks; each offset 1..window is a shifted-array compare (no Python
    loop over rows), pairs canonicalize by elementwise min/max, and each
    batch pre-aggregates to DISTINCT (pair, count) partials — the shuffle
    and the driver merge scale with the PAIR VOCABULARY (bounded by the
    top-k block merge), never the corpus.  Ties break (count desc, pair
    asc) to match the oracle."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["text"])
    from ray.data.aggregate import Sum

    def partial(df: pd.DataFrame) -> "pa.Table":
        import pyarrow as pa

        ex = _token_lists(df["text"]).explode().dropna()
        empty = pa.table({"pair": pa.array([], pa.string()),
                          "partial_n": pa.array([], pa.int64())})
        if len(ex) < 2:
            return empty
        tok = ex.to_numpy()  # object array: pandas str-concat beats
        doc = ex.index.to_numpy()  # np.char on U-dtype ~4x (measured)
        parts = []
        for off in range(1, window + 1):
            if off >= len(tok):
                break
            a, b = tok[:-off], tok[off:]
            same = doc[:-off] == doc[off:]
            if not same.any():
                continue
            a, b = a[same], b[same]
            swap = a > b
            lo = pd.Series(np.where(swap, b, a))
            hi = pd.Series(np.where(swap, a, b))
            parts.append(lo + " " + hi)
        if not parts:
            return empty
        vc = pd.concat(parts, ignore_index=True).value_counts()
        return pa.table({"pair": pa.array(vc.index.to_numpy(dtype=str)),
                         "partial_n": pa.array(vc.to_numpy(np.int64))})

    counts = ds.map_batches(partial, batch_format="pandas") \
        .groupby("pair").aggregate(Sum("partial_n", alias_name="n"))

    def block_topk(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(["n", "pair"], ascending=[False, True],
                              kind="mergesort").head(k)

    merged = counts.map_batches(block_topk, batch_format="pandas").to_pandas()
    return merged.sort_values(["n", "pair"], ascending=[False, True],
                              kind="mergesort").head(k).reset_index(drop=True)

def bpe_pair_counts(sf_dir: str, k: int = 30):
    """The first BPE merge step of tokenizer training: corpus-weighted
    counts of ADJACENT CHARACTER pairs, computed over the UNIQUE-word
    vocabulary with word frequencies as weights (Sennrich et al. 2016,
    "Neural Machine Translation of Rare Words with Subword Units" —
    public).  The top pair is what a BPE trainer would merge first.

    Two vocabulary-bounded stages: (1) word frequencies — per-batch
    value_counts partials, one vocab-sized groupby-sum; (2) overlapping
    char-pair explode over the VOCAB (not the corpus: each unique word's
    pairs extract once and carry its weight), partial pair sums, one
    pair-vocabulary groupby-sum, block top-k, tiny driver merge.  The
    corpus text crosses the wire once; everything downstream scales with
    vocabulary."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["text"])
    from ray.data.aggregate import Sum

    def word_partial(df: pd.DataFrame) -> pd.DataFrame:
        vc = _token_lists(df["text"]).explode().dropna().value_counts()
        return pd.DataFrame({"word": vc.index.to_numpy(),
                             "partial_n": vc.to_numpy(np.int64)})

    vocab = ds.map_batches(word_partial, batch_format="pandas") \
        .groupby("word").aggregate(Sum("partial_n", alias_name="wn"))

    def pair_partial(df: pd.DataFrame) -> pd.DataFrame:
        w = df["word"].astype(str)
        pairs = w.str.findall(r"(?=(..))")  # overlapping char 2-grams
        ex = pairs.explode().dropna()
        if not len(ex):
            return pd.DataFrame({"pair": pd.Series([], dtype=str),
                                 "partial_n": pd.Series([], dtype=np.int64)})
        wn = df["wn"].reindex(ex.index).to_numpy(np.int64)
        g = pd.DataFrame({"pair": ex.to_numpy(), "n": wn}) \
            .groupby("pair", sort=False)["n"].sum()
        return pd.DataFrame({"pair": g.index.to_numpy(),
                             "partial_n": g.to_numpy(np.int64)})

    counts = vocab.map_batches(pair_partial, batch_format="pandas") \
        .groupby("pair").aggregate(Sum("partial_n", alias_name="n"))

    def block_topk(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(["n", "pair"], ascending=[False, True],
                              kind="mergesort").head(k)

    merged = counts.map_batches(block_topk, batch_format="pandas").to_pandas()
    return merged.sort_values(["n", "pair"], ascending=[False, True],
                              kind="mergesort").head(k).reset_index(drop=True)

def zipf_slope(sf_dir: str, k: int = 200):
    """Corpus Zipf diagnostic: the least-squares slope of ln(frequency) on
    ln(rank) over the top-``k`` tokens — natural text sits near -1; a
    slope far off flags synthetic/templated or boilerplate-heavy corpora
    (a standard corpus-health check before training).

    The heavy part is the vocabulary count (reused
    :func:`vocab_top_tokens` — one vocabulary-bounded aggregate); the
    regression itself runs on k rows driver-side, bit-replayed by the
    oracle's ``regr_slope``/``regr_intercept`` over identical ln values."""
    v = vocab_top_tokens(sf_dir, k)
    n = v["n"].to_numpy(np.float64)
    r = np.arange(1, len(v) + 1, dtype=np.float64)
    x, y = np.log(r), np.log(n)
    kk = float(len(v))
    sx, sy, sxx, sxy = x.sum(), y.sum(), (x * x).sum(), (x * y).sum()
    slope = (sxy - sx * sy / kk) / (sxx - sx ** 2 / kk)
    intercept = (sy - slope * sx) / kk
    from ..functions.rounding import round_half_away

    return pd.DataFrame({"k": np.array([len(v)], dtype=np.int64),
                         "slope": round_half_away(
                             np.array([slope]), 7),
                         "intercept": round_half_away(
                             np.array([intercept]), 7)})
