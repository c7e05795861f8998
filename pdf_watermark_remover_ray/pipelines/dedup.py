"""Deduplication operators over the ``documents`` / ``embeddings`` tables.

Five dedup families, each expressed Ray-Data-first:

- exact:        content-hash column (vectorized) → hash-partition groupby →
                keep min doc_id (the canonical exact-dedup shuffle).
- n-gram Jaccard: blocked all-pairs verification — block by (lang, source),
                pairs inside blocks only, exact Jaccard over word-bigram sets.
- MinHash+LSH:  shingle → 64 minhashes → band rows → groupby(band) buckets →
                candidate pairs → exact-Jaccard verify. Scale path: the only
                shuffle moves (band_hash, doc_id) pairs, not documents.
- SimHash:      64-bit simhash, 4×16-bit band blocking, Hamming ≤ threshold.
- embedding:    cosine ≥ θ near-dup pairs over the embedding column.

All pair outputs are canonical (id_a < id_b) and deduplicated.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from ..stages.partition import add_partition_column

from ..functions.hashing import md5_u32, md5_u64
from ..functions.rounding import round_half_away

_POP8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized popcount of a uint64 array (Hamming distances)."""
    return _POP8[x.view(np.uint8).reshape(len(x), 8)].sum(axis=1).astype(np.int64) \
        if len(x) else np.zeros(0, dtype=np.int64)


def _read_docs(sf_dir: str, columns=("doc_id", "text")):
    return ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=list(columns))


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def exact_dedup(sf_dir: str, num_partitions: int = 16):
    """One surviving doc_id per distinct text (+ copy count).

    The content hash is two independently-keyed vectorized 64-bit siphashes
    (``pd.util.hash_pandas_object`` — one cython call per batch, no per-row
    Python): a 128-bit composite, so collisions stay negligible at 10^12
    docs where a single 64-bit hash would birthday-collide."""
    ds = _read_docs(sf_dir)

    def add_hash(df: pd.DataFrame) -> pd.DataFrame:
        s = df["text"].fillna("")
        h1 = pd.util.hash_pandas_object(s, index=False).to_numpy()
        h2 = pd.util.hash_pandas_object(s, index=False,
                                        hash_key="9c39a2b1f04d58e7").to_numpy()
        return pd.DataFrame({"doc_id": df["doc_id"].to_numpy(),
                             "h1": h1.view(np.int64), "h2": h2.view(np.int64)})

    ds = ds.map_batches(add_hash, batch_format="pandas")
    ds = add_partition_column(ds, key="h1", num_partitions=num_partitions)

    def keep_first(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["h1", "h2"], sort=False, as_index=False).agg(
            doc_id=("doc_id", "min"), n_copies=("doc_id", "size")
        )
        return g[["doc_id", "n_copies"]]

    return ds.groupby("part").map_groups(keep_first, batch_format="pandas")


# ---------------------------------------------------------------------------
# shingles + exact jaccard (shared by several verifiers)
# ---------------------------------------------------------------------------

def word_bigram_set(text: str) -> set[str]:
    toks = (text or "").split()
    return {toks[i] + " " + toks[i + 1] for i in range(len(toks) - 1)}


def jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    u = len(a | b)
    return len(a & b) / u if u else 0.0


_EMPTY_PAIRS = {"doc_a": pd.Series([], dtype=np.int64),
                "doc_b": pd.Series([], dtype=np.int64),
                "jaccard": pd.Series([], dtype=float)}


def _distributed_verify_pairs(sf_dir: str, cand: pd.DataFrame, threshold: float,
                              num_partitions: int = 16) -> pd.DataFrame:
    """Exact word-bigram-Jaccard verification of candidate id pairs WITHOUT
    materializing the documents table on the driver (the round-1
    scale-killer was a full-table ``to_pandas`` dict here).

    The candidate pair list (small — bounded by LSH bucket collisions) is
    hash-assigned to verify partitions and broadcast ONCE (``ray.put``);
    each document row is filtered cluster-side (inner merge against the
    needed-id multimap) and ships only to the partitions whose pairs
    reference it; Jaccard runs in hash-partitioned ``map_groups``.  Texts
    never leave the cluster; the driver sees only id pairs and scores."""
    if len(cand) == 0:
        return pd.DataFrame(_EMPTY_PAIRS)
    cand = cand.reset_index(drop=True).copy()
    pk = pd.util.hash_pandas_object(
        cand["doc_a"].astype(np.int64) * np.int64(1_000_003)
        ^ cand["doc_b"].astype(np.int64), index=False).to_numpy()
    cand["vp"] = (pk % num_partitions).astype(np.int32)
    need = pd.concat([
        cand[["doc_a", "vp"]].rename(columns={"doc_a": "doc_id"}),
        cand[["doc_b", "vp"]].rename(columns={"doc_b": "doc_id"}),
    ]).drop_duplicates()
    ref = ray.put((cand, need))

    def replicate(t: pa.Table) -> pa.Table:
        _, need_ = ray.get(ref)
        out = t.to_pandas().merge(need_, on="doc_id", how="inner")
        # Arrow block out: the vp-groupby downstream sorts blocks, and Ray's
        # sort path on pandas blocks is ~8× slower than on Arrow
        return pa.Table.from_pandas(out[["vp", "doc_id", "text"]],
                                    preserve_index=False)

    def verify_block(g: pd.DataFrame) -> pd.DataFrame:
        cand_, _ = ray.get(ref)
        pairs = cand_[cand_["vp"] == int(g["vp"].iloc[0])]
        sh = {int(d): word_bigram_set(t)
              for d, t in zip(g["doc_id"], g["text"].fillna(""))}
        sims = np.array([jaccard(sh[int(a)], sh[int(b)])
                         for a, b in zip(pairs["doc_a"], pairs["doc_b"])]) \
            if len(pairs) else np.zeros(0)
        out = pd.DataFrame({"doc_a": pairs["doc_a"].to_numpy(np.int64),
                            "doc_b": pairs["doc_b"].to_numpy(np.int64),
                            "jaccard": round_half_away(sims, 6)})
        return out[out["jaccard"] >= threshold]

    # candidate-id filter pushed INTO the scan (row-group pruning: at scale
    # the candidates touch a sliver of the corpus files), capped so the
    # predicate itself stays small; the merge in `replicate` remains the
    # exact filter either way.
    need_ids = need["doc_id"].unique()
    docs = _read_docs(sf_dir)
    if len(need_ids) <= 200_000:
        import pyarrow.compute as pc

        docs = ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"],
            filter=pc.field("doc_id").isin(pa.array(need_ids)))
    verified = docs \
        .map_batches(replicate, batch_format="pyarrow", zero_copy_batch=True) \
        .groupby("vp").map_groups(verify_block, batch_format="pandas") \
        .to_pandas()
    if not len(verified.columns):
        return pd.DataFrame(_EMPTY_PAIRS)
    return verified.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)


# ---------------------------------------------------------------------------
# blocked n-gram Jaccard (SQL-oracle-able: deterministic blocking)
# ---------------------------------------------------------------------------

def _block_pair_sims(ids: np.ndarray, texts: list[str]) -> pd.DataFrame:
    """All-pairs word-bigram Jaccard within one block — vectorized via an
    inverted shingle index, NO per-pair Python loop:

    - shingle vocabulary via one ``pd.factorize`` over the block;
    - intersection sizes from per-shingle doc-pair co-occurrence: segments of
      the (shingle → docs) index grouped BY SEGMENT SIZE so pair expansion is
      one ``triu_indices`` broadcast per distinct size, then one ``np.unique``
      over encoded pair keys;
    - unions from the per-doc set sizes; empty-shingle docs pair at 1.0
      (matching the oracle's empty-union convention).

    ``ids`` must be ascending so emitted pairs are canonical (doc_a < doc_b).
    Cost is O(sum over shingles of df²) — the co-occurrence mass itself —
    instead of O(n² · |shingles|) row-at-a-time Python."""
    n = len(ids)
    shingle_lists = [sorted(word_bigram_set(t)) for t in texts]
    sizes = np.array([len(s) for s in shingle_lists], dtype=np.int64)
    nonempty = [s for s in shingle_lists if s]
    a_parts: list[np.ndarray] = []
    if nonempty:
        flat = np.concatenate([np.asarray(s, dtype=object) for s in nonempty])
        codes, _ = pd.factorize(flat)
        doc_idx = np.repeat(np.arange(n), sizes)
        order = np.argsort(codes, kind="stable")
        sc, dc = codes[order], doc_idx[order]
        starts = np.flatnonzero(np.concatenate([[True], sc[1:] != sc[:-1]]))
        ends = np.concatenate([starts[1:], [len(sc)]])
        seg_sizes = ends - starts
        for s in np.unique(seg_sizes):
            if s < 2:
                continue
            rows = np.flatnonzero(seg_sizes == s)
            mat = np.sort(dc[starts[rows][:, None] + np.arange(s)[None, :]], axis=1)
            ia, ib = np.triu_indices(int(s), k=1)
            a_parts.append(mat[:, ia].ravel() * n + mat[:, ib].ravel())
    inter_keys = np.concatenate(a_parts) if a_parts else np.zeros(0, dtype=np.int64)
    uk, counts = np.unique(inter_keys, return_counts=True)
    ai, bi = uk // n, uk % n
    union = sizes[ai] + sizes[bi] - counts
    sim = counts / union  # counts >= 1 ⇒ union >= 1
    emp = np.flatnonzero(sizes == 0)
    if len(emp) >= 2:
        ia, ib = np.triu_indices(len(emp), k=1)
        ai = np.concatenate([ai, emp[ia]])
        bi = np.concatenate([bi, emp[ib]])
        sim = np.concatenate([sim, np.ones(len(ia))])
    return pd.DataFrame({"doc_a": ids[ai], "doc_b": ids[bi], "sim": sim})


def _cap_block(g: pd.DataFrame, block, max_block_docs: int,
               op: str = "ngram_jaccard_pairs") -> pd.DataFrame:
    """Bound an oversized block/bucket to the lowest doc_ids with a LOGGED
    drop — never a silent truncation (runs inside the map_groups worker; the
    warning lands in the worker log and Ray's driver log mirror).

    Shared by the n-gram blocker AND the LSH bucket pairers: a degenerate
    bucket (e.g. a boilerplate-heavy corpus, or every empty doc sharing the
    filler signature) would otherwise make ``triu_indices`` quadratic in a
    single task."""
    if len(g) <= max_block_docs:
        return g
    import logging

    logging.getLogger(__name__).warning(
        "%s: block %r has %d docs > cap %d; scoring only the "
        "%d lowest doc_ids — pairs involving the dropped docs are NOT scored",
        op, block, len(g), max_block_docs, max_block_docs)
    return g.nsmallest(max_block_docs, "doc_id")


def _dedup_pairs(pairs_ds, extra_cols: tuple[str, ...] = (),
                 num_partitions: int = 16):
    """Cluster-side candidate-pair dedup: ONE hash shuffle keyed by the
    canonical pair key, then ``drop_duplicates`` inside each partition.
    Identical pairs (emitted by several bands/buckets) hash to the same
    partition, so the per-partition drop is globally exact — the full
    (pre-dedup) candidate list never lands on the driver."""
    cols = ["doc_a", "doc_b", *extra_cols]

    def add_key(df: pd.DataFrame) -> pd.DataFrame:
        pk = pd.util.hash_pandas_object(
            df["doc_a"].astype(np.int64) * np.int64(1_000_003)
            ^ df["doc_b"].astype(np.int64), index=False).to_numpy()
        df = df[cols].copy()
        df["pair_part"] = (pk % num_partitions).astype(np.int32)
        return df

    def drop(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(["doc_a", "doc_b"])[cols]

    return pairs_ds.map_batches(add_key, batch_format="pandas") \
        .groupby("pair_part").map_groups(drop, batch_format="pandas")


def ngram_jaccard_pairs(sf_dir: str, threshold: float = 0.2, num_partitions: int = 16,
                        max_block_docs: int = 50_000):
    """All pairs within a (lang, source) block with word-bigram Jaccard ≥ θ.

    The blocking key bounds the quadratic term: pairs are enumerated only
    inside hash-partition-local blocks.  A block larger than
    ``max_block_docs`` is capped to the lowest doc_ids with a LOGGED drop
    (never silent) — at 100 TB a dominant (en, web) block must be bounded
    here, with MinHash-LSH as the declared scale path for full coverage."""
    ds = _read_docs(sf_dir, columns=("doc_id", "text", "lang", "source"))

    def block_key(df: pd.DataFrame) -> pd.DataFrame:
        df["block"] = df["lang"].fillna("") + "|" + df["source"].fillna("")
        return df[["doc_id", "text", "block"]]

    ds = ds.map_batches(block_key, batch_format="pandas")
    ds = add_partition_column(ds, key="block", num_partitions=num_partitions)

    def pairs_in_block(df: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for block, g in df.groupby("block", sort=False):
            g = _cap_block(g, block, max_block_docs)
            g = g.sort_values("doc_id")
            sims = _block_pair_sims(g["doc_id"].to_numpy(np.int64),
                                    g["text"].fillna("").tolist())
            keep = sims[sims["sim"] >= threshold]
            frames.append(pd.DataFrame(
                {"doc_a": keep["doc_a"].to_numpy(np.int64),
                 "doc_b": keep["doc_b"].to_numpy(np.int64),
                 "jaccard": round_half_away(keep["sim"].to_numpy(), 6)}))
        return pd.concat(frames, ignore_index=True) if frames else \
            pd.DataFrame(_EMPTY_PAIRS)

    return ds.groupby("part").map_groups(pairs_in_block, batch_format="pandas")


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

N_HASHES = 64
N_BANDS = 16  # 4 rows per band
MINHASH_P = 2147483647  # 2^31 - 1: products with 32-bit inputs fit int64,
MINHASH_M = 1_000_003   # so the SAME math runs overflow-free in DuckDB SQL
_MINHASH_FILLER = MINHASH_P  # empty-doc sentinel: > any real min (mins < P)


def _minhash_params(seed: int = 42):
    rng = np.random.default_rng(seed)
    a = rng.integers(1, MINHASH_P, size=N_HASHES, dtype=np.int64)
    b = rng.integers(0, MINHASH_P, size=N_HASHES, dtype=np.int64)
    return a, b


_md5_u32 = md5_u32  # SQL-reproducible hashes (functions/hashing.py)
_md5_u64 = md5_u64


class MinHasher:
    """Actor-pool stage: text → 16 LSH band rows (band_id, band_hash, doc_id).

    Hash params generated once per actor from a fixed seed (deterministic
    across the pool).  Vectorized across the batch: shingles are factorized
    once so md5 runs only per UNIQUE shingle, the 64×M permutation-min runs
    as one matrix op with a per-document segmented min
    (``np.minimum.reduceat``) — no per-document Python beyond shingling.

    All arithmetic is mod 2^31-1 on 32-bit md5-prefix hashes: every
    intermediate fits int64 WITHOUT wraparound, so the DuckDB oracle can
    replay the identical signature/banding math (queries.oracle_sql)."""

    def __init__(self, seed: int = 42) -> None:
        self.a, self.b = _minhash_params(seed)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        texts = batch["text"].fillna("")
        shingle_lists = [sorted(word_bigram_set(t)) for t in texts]
        counts = np.array([len(s) for s in shingle_lists], dtype=np.int64)
        n_docs = len(texts)
        sigs = np.full((n_docs, N_HASHES), _MINHASH_FILLER, dtype=np.int64)
        nonempty = np.flatnonzero(counts)
        if len(nonempty):
            flat = np.concatenate([np.asarray(shingle_lists[i], dtype=object)
                                   for i in nonempty])
            codes, uniq = pd.factorize(flat)
            xu = _md5_u32(np.asarray(uniq, dtype=object)) % MINHASH_P
            # permutations computed per UNIQUE shingle (64 × |vocab|), then
            # one gather over occurrences — the mul/add/mod never touches
            # the occurrence-expanded matrix
            vu = (self.a[:, None] * xu[None, :] + self.b[:, None]) % MINHASH_P
            v = vu[:, codes]  # (64, M) gather
            seg = np.concatenate([[0], np.cumsum(counts[nonempty])[:-1]])
            mins = np.minimum.reduceat(v, seg, axis=1)  # (64, n_nonempty)
            sigs[nonempty] = mins.T
        rows_per_band = N_HASHES // N_BANDS
        band = sigs.reshape(n_docs, N_BANDS, rows_per_band)
        bh = np.zeros((n_docs, N_BANDS), dtype=np.int64)
        for r in range(rows_per_band):  # Horner fold, mod P each step
            bh = (bh * MINHASH_M + band[:, :, r]) % MINHASH_P
        return pd.DataFrame({
            "doc_id": np.repeat(batch["doc_id"].to_numpy(np.int64), N_BANDS),
            "band_id": np.tile(np.arange(N_BANDS, dtype=np.int32), n_docs),
            "band_hash": bh.reshape(-1),
        })


def minhash_lsh_pairs(sf_dir: str, threshold: float = 0.5,
                      concurrency=(2, 16), max_bucket_docs: int = 2_000):
    """MinHash-LSH near-dup pairs, exact-Jaccard verified.

    Pipeline: map_batches(MinHasher) → groupby(band_id, band_hash) → candidate
    pairs per bucket (capped at ``max_bucket_docs`` docs per bucket, LOGGED
    drop — a degenerate bucket must not go quadratic in one task) →
    cluster-side pair dedup (hash-partitioned, never a driver-wide
    drop_duplicates) → distributed verify.  Only band rows shuffle; texts are
    re-read for the (small) candidate set.  The signature stage is the compute
    bottleneck → autoscaling actor pool (min, max) sizes itself to the host
    instead of pinning a fixed worker count."""
    ds = _read_docs(sf_dir)
    bands = ds.map_batches(MinHasher, batch_format="pandas", batch_size=4096,
                           concurrency=concurrency)

    def bucket_pairs(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for key, g in df.groupby(["band_id", "band_hash"], sort=False):
            if len(g) < 2:
                continue
            g = _cap_block(g, key, max_bucket_docs, op="minhash_lsh_pairs")
            ids = np.sort(g["doc_id"].to_numpy())
            ia, ib = np.triu_indices(len(ids), k=1)
            out.append(pd.DataFrame({"doc_a": ids[ia], "doc_b": ids[ib]}))
        return pd.concat(out, ignore_index=True) if out else \
            pd.DataFrame({"doc_a": pd.Series([], dtype=np.int64),
                          "doc_b": pd.Series([], dtype=np.int64)})

    # ONE hash shuffle into P partitions keyed by the bucket, then vectorized
    # bucket pairing per partition — not one map_groups task per tiny bucket.
    bands = add_partition_column(bands, key="band_hash", num_partitions=16)
    cand_ds = bands.groupby("part") \
        .map_groups(bucket_pairs, batch_format="pandas")
    candidates = _dedup_pairs(cand_ds).to_pandas()
    if not len(candidates.columns):  # all-empty map_groups drops the schema
        candidates = pd.DataFrame({"doc_a": pd.Series([], dtype=np.int64),
                                   "doc_b": pd.Series([], dtype=np.int64)})
    # candidates is DEDUPED id pairs only (small: bucket-capped collisions);
    # verification is fully distributed — texts never reach the driver.
    return _distributed_verify_pairs(sf_dir, candidates, threshold)


def winnow_dup_pairs(sf_dir: str, num_partitions: int = 16,
                     concurrency: int = 2, max_bucket_docs: int = 2_000):
    """Near-dup candidate pairs by winnowing-sketch collision: documents
    whose 64-bit min-8-gram-hash sketches (text.Fingerprinter's
    ``winnow64``) are EQUAL.  A fourth blocking family next to MinHash /
    SimHash / embedding: one scalar sketch per doc, so the shuffle moves
    (sketch, doc_id) pairs only — the cheapest possible candidate generator,
    with MinHash-LSH as the higher-recall path.  Docs shorter than the gram
    window (sketch 0) are excluded: an empty sketch is no evidence of
    similarity.  Fully SQL-replayable (same md5-prefix gram hash)."""
    from .text import Fingerprinter

    ds = _read_docs(sf_dir)
    sk = ds.map_batches(Fingerprinter, batch_format="pandas", batch_size=4096,
                        concurrency=concurrency)

    def nonzero(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["winnow64"] != 0]
        return df[["doc_id", "winnow64"]]

    sk = sk.map_batches(nonzero, batch_format="pandas")
    sk = add_partition_column(sk, key="winnow64",
                              num_partitions=num_partitions)

    def bucket_pairs(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for key, g in df.groupby("winnow64", sort=False):
            if len(g) < 2:
                continue
            g = _cap_block(g, key, max_bucket_docs, op="winnow_dup_pairs")
            ids = np.sort(g["doc_id"].to_numpy())
            ia, ib = np.triu_indices(len(ids), k=1)
            out.append(pd.DataFrame({
                "doc_a": ids[ia], "doc_b": ids[ib],
                "winnow64": np.repeat(g["winnow64"].iloc[0], len(ia))}))
        return pd.concat(out, ignore_index=True) if out else \
            pd.DataFrame({"doc_a": pd.Series([], dtype=np.int64),
                          "doc_b": pd.Series([], dtype=np.int64),
                          "winnow64": pd.Series([], dtype=np.int64)})

    return sk.groupby("part").map_groups(bucket_pairs, batch_format="pandas")


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

class SimHasher:
    """64-bit simhash over word tokens — vectorized across the batch: tokens
    are factorized once so md5 runs only per UNIQUE token, per-document bit
    votes via ``np.add.reduceat`` on the token segments.  The md5-prefix
    token hash is SQL-reproducible, so the DuckDB oracle replays the exact
    signature/banding/Hamming pipeline (queries.oracle_sql)."""

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        texts = batch["text"].fillna("")
        tok_lists = [t.split() for t in texts]
        counts = np.array([len(t) for t in tok_lists], dtype=np.int64)
        n_docs = len(texts)
        out = np.zeros(n_docs, dtype=np.uint64)
        nonempty = np.flatnonzero(counts)
        if len(nonempty):
            flat = np.concatenate([np.asarray(tok_lists[i], dtype=object)
                                   for i in nonempty])
            codes, uniq = pd.factorize(flat)
            hs = _md5_u64(np.asarray(uniq, dtype=object))[codes]
            bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1) \
                .astype(np.int64)
            pm = 2 * bits - 1  # (M, 64) ±1 votes
            seg = np.concatenate([[0], np.cumsum(counts[nonempty])[:-1]])
            votes = np.add.reduceat(pm, seg, axis=0)  # (n_nonempty, 64)
            sh = ((votes > 0).astype(np.uint64)
                  << np.arange(64, dtype=np.uint64)[None, :]).sum(axis=1)
            out[nonempty] = sh
        return pd.DataFrame({"doc_id": batch["doc_id"].to_numpy(np.int64),
                             "simhash": out.astype(np.int64)})


def simhash_pairs(sf_dir: str, max_hamming: int = 3, concurrency=(2, 16),
                  max_bucket_docs: int = 2_000):
    """Near-dup pairs with simhash Hamming distance ≤ k via 4-band blocking
    (a pair within Hamming ≤ 3 must agree exactly on ≥ 1 of 4 16-bit bands).
    Oversized band buckets cap at ``max_bucket_docs`` (LOGGED drop) and the
    cross-band pair dedup runs cluster-side, hash-partitioned by pair key."""
    ds = _read_docs(sf_dir)
    sigs = ds.map_batches(SimHasher, batch_format="pandas", batch_size=4096,
                          concurrency=concurrency)

    def band_rows(df: pd.DataFrame) -> pd.DataFrame:
        s = df["simhash"].to_numpy(np.int64).astype(np.uint64)
        frames = []
        for band in range(4):
            frames.append(pd.DataFrame({
                "doc_id": df["doc_id"].to_numpy(np.int64),
                "simhash": df["simhash"].to_numpy(np.int64),
                "band_id": np.int32(band),
                "band_key": ((s >> np.uint64(band * 16)) & np.uint64(0xFFFF)).astype(np.int64),
            }))
        return pd.concat(frames, ignore_index=True)

    bands = sigs.map_batches(band_rows, batch_format="pandas")

    def bucket_pairs(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for key, g in df.groupby(["band_id", "band_key"], sort=False):
            if len(g) < 2:
                continue
            g = _cap_block(g, key, max_bucket_docs, op="simhash_pairs")
            g = g.sort_values("doc_id")
            ids = g["doc_id"].to_numpy()
            hs = g["simhash"].to_numpy(np.int64).astype(np.uint64)
            ia, ib = np.triu_indices(len(ids), k=1)
            ham = _popcount64(hs[ia] ^ hs[ib])
            keep = ham <= max_hamming
            if keep.any():
                out.append(pd.DataFrame({"doc_a": ids[ia[keep]], "doc_b": ids[ib[keep]],
                                         "hamming": ham[keep].astype(np.int64)}))
        return pd.concat(out, ignore_index=True) if out else \
            pd.DataFrame({"doc_a": pd.Series([], dtype=np.int64),
                          "doc_b": pd.Series([], dtype=np.int64),
                          "hamming": pd.Series([], dtype=np.int64)})

    bands = add_partition_column(bands, key="band_key", num_partitions=16)
    pairs_ds = bands.groupby("part") \
        .map_groups(bucket_pairs, batch_format="pandas")
    # a pair can surface from up to 4 bands: dedup cluster-side (pair-key
    # hash partitions), never a driver-wide drop_duplicates
    pairs = _dedup_pairs(pairs_ds, extra_cols=("hamming",)).to_pandas()
    if not len(pairs.columns):  # all-empty map_groups drops the schema
        pairs = pd.DataFrame({"doc_a": pd.Series([], dtype=np.int64),
                              "doc_b": pd.Series([], dtype=np.int64),
                              "hamming": pd.Series([], dtype=np.int64)})
    return pairs.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)


# ---------------------------------------------------------------------------
# embedding cosine near-dup
# ---------------------------------------------------------------------------

def _cc_driver_labels(u: np.ndarray, v: np.ndarray) -> pd.DataFrame:
    """Min-label connected components on driver-local numpy arrays:
    symmetric ``minimum.at`` propagation + pointer jumping until fixpoint.
    Produces the same canonical labels (component minimum node id) as the
    distributed hash-to-min rounds — min-label is algorithm-independent."""
    nodes, inv = np.unique(np.concatenate([u, v]), return_inverse=True)
    ui, vi = inv[: len(u)], inv[len(u):]
    lab = np.arange(len(nodes), dtype=np.int64)
    while True:
        before = lab
        lab = lab.copy()
        np.minimum.at(lab, ui, lab[vi])
        np.minimum.at(lab, vi, lab[ui])
        lab = lab[lab]  # pointer jumping: halve chain depth each round
        if np.array_equal(lab, before):
            break
    # nodes are sorted ascending, so index order == id order and the min
    # index maps to the min node id of the component
    return pd.DataFrame({"node": nodes, "label": nodes[lab]})


def connected_components(edges, num_partitions: int = 16, max_rounds: int = 64,
                         driver_cc_threshold: int = 2_000_000):
    """Distributed connected components over an edge Dataset ``(u, v)`` —
    returns a Dataset ``(node, label)`` where ``label`` is the component's
    minimum node id.

    Hash-to-min formulation (Rastogi et al., "Finding Connected Components in
    Map-Reduce in Logarithmic Rounds", 2012 — public): each round, every node
    ``u`` sends the minimum of its neighborhood ``C(u) = {u} ∪ N(u)`` to all
    of ``C(u)``; edge sets converge to stars centered at component minima in
    O(log diameter) rounds.  Each round is ONE hash shuffle of the current
    edge frontier (symmetrize → partition by node → vectorized per-node min
    emit) — the corpus itself never moves, only near-dup edges, and the
    driver holds nothing but the round loop and a content signature.
    Per-round ``materialize()`` is on the edge frontier (bounded by the
    near-dup pair count), deliberately NOT on any input table.

    Fixpoint test: the frontier's ORDER-INSENSITIVE content hash (wrapped
    uint64 sum of per-edge row hashes) plus its count — set-sensitive, so
    two different frontiers can't alias the way a plain (Σu, Σv) signature
    could (e.g. {(2,1),(4,3)} vs {(2,3),(4,1)}).

    Size guard (the q3-family broadcast-threshold pattern): the edge list
    is the NEAR-DUP PAIR set — orders of magnitude smaller than the corpus
    and already deduped — so when it fits comfortably on the driver
    (``driver_cc_threshold`` edges, ~32 MB of int64 pairs at the default)
    the rounds run as one numpy min-label pass instead of O(log diameter)
    distributed exchanges whose input is tiny and whose cost is pure
    AllToAll fixed overhead.  Labels are identical (component min id is
    canonical); above the threshold the distributed loop runs unchanged."""
    edges = edges.materialize()
    if edges.count() <= driver_cc_threshold:
        df = edges.to_pandas()  # bounded by the guard: ≤ threshold pairs
        if not len(df):
            return ray.data.from_pandas(
                pd.DataFrame({"node": pd.Series([], dtype=np.int64),
                              "label": pd.Series([], dtype=np.int64)}))
        lab = _cc_driver_labels(df["u"].to_numpy(np.int64),
                                df["v"].to_numpy(np.int64))
        return ray.data.from_pandas(lab)

    def symmetrize(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "u": np.concatenate([df["u"].to_numpy(np.int64),
                                 df["v"].to_numpy(np.int64)]),
            "v": np.concatenate([df["v"].to_numpy(np.int64),
                                 df["u"].to_numpy(np.int64)]),
        })

    def propagate(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["u", "v"])
        gm = g.groupby("u", sort=False)["v"].min()
        nodes = gm.index.to_numpy(np.int64)
        m = np.minimum(gm.to_numpy(np.int64), nodes)  # min over {u} ∪ N(u)
        mu = pd.Series(m, index=nodes)
        src = np.concatenate([g["v"].to_numpy(np.int64), nodes])
        dst = np.concatenate([mu[g["u"].to_numpy(np.int64)].to_numpy(np.int64),
                              m])
        keep = src != dst
        out = pd.DataFrame({"u": src[keep], "v": dst[keep]})
        return out.drop_duplicates(["u", "v"])

    def sig_partial(df: pd.DataFrame) -> pd.DataFrame:
        h = pd.util.hash_pandas_object(df[["u", "v"]], index=False).to_numpy()
        return pd.DataFrame({"h": [np.int64(h.sum(dtype=np.uint64)
                                            .view(np.int64))],
                             "n": [np.int64(len(df))]})

    def signature(ds) -> tuple[int, int]:
        parts = ds.map_batches(sig_partial, batch_format="pandas").to_pandas()
        return (int(parts["h"].to_numpy(np.int64).view(np.uint64)
                    .sum(dtype=np.uint64)), int(parts["n"].sum()))

    prev_sig = None
    for _ in range(max_rounds):
        sym = edges.map_batches(symmetrize, batch_format="pandas")
        part = add_partition_column(sym, key="u", num_partitions=num_partitions)
        edges = part.groupby("part").map_groups(
            propagate, batch_format="pandas").materialize()
        sig = signature(edges)
        if sig == prev_sig:  # deterministic round fn: same set in ⇒ same set out
            break
        prev_sig = sig
    else:
        import logging

        logging.getLogger(__name__).warning(
            "connected_components: no fixpoint after %d rounds; labels may "
            "reflect a partially-contracted graph", max_rounds)

    def to_labels(df: pd.DataFrame) -> pd.DataFrame:
        # star edges (x, m): every non-rep x labels m; reps label themselves
        return pd.DataFrame({
            "node": np.concatenate([df["u"].to_numpy(np.int64),
                                    df["v"].to_numpy(np.int64)]),
            "label": np.concatenate([df["v"].to_numpy(np.int64),
                                     df["v"].to_numpy(np.int64)]),
        })

    labels = edges.map_batches(to_labels, batch_format="pandas")
    labels = add_partition_column(labels, key="node",
                                  num_partitions=num_partitions)

    def min_label(g: pd.DataFrame) -> pd.DataFrame:
        gm = g.groupby("node", sort=False)["label"].min()
        nodes = gm.index.to_numpy(np.int64)
        return pd.DataFrame({"node": nodes,
                             "label": np.minimum(gm.to_numpy(np.int64), nodes)})

    return labels.groupby("part").map_groups(min_label, batch_format="pandas")


_EMPTY_CLUSTERS = {"doc_id": pd.Series([], dtype=np.int64),
                   "rep_id": pd.Series([], dtype=np.int64)}


def dedup_clusters(sf_dir: str, threshold: float = 0.5):
    """Near-dup clusters: MinHash-LSH verified pairs → connected components →
    one representative (min doc_id) per cluster.  Output: ``(doc_id,
    rep_id)`` for every doc in at least one near-dup pair; the dedup keep
    list is ``doc_id == rep_id`` plus all unpaired docs.

    This is the capstone the pair-emitting dedup ops feed at 100 TB: pairs
    are transitive ("A≈B, B≈C" must collapse to ONE survivor), so cluster
    formation has to run before any row is dropped.  Oracle: the same
    MinHash SQL replay + a recursive-CTE reachability closure."""
    pairs = minhash_lsh_pairs(sf_dir, threshold)
    if not len(pairs):
        return pd.DataFrame(_EMPTY_CLUSTERS)
    edges = ray.data.from_pandas(pd.DataFrame({
        "u": pairs["doc_a"].to_numpy(np.int64),
        "v": pairs["doc_b"].to_numpy(np.int64)}))
    out = connected_components(edges).to_pandas()
    return pd.DataFrame({"doc_id": out["node"].to_numpy(np.int64),
                         "rep_id": out["label"].to_numpy(np.int64)}) \
        .sort_values("doc_id").reset_index(drop=True)


def embedding_dup_pairs(sf_dir: str, threshold: float = 0.30,
                        tile_rows: int = 4096):
    """Pairs of embeddings with cosine similarity ≥ θ.

    Blocked by ``label`` (the natural cluster key): vectors shuffle once into
    label blocks; within a block the pair scores run as TILED matmuls
    (``tile_rows`` × block), so a huge label never materializes its full
    n×n similarity matrix — peak memory is O(tile_rows × block)."""
    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding", "label"])

    def pairs_in_label(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("vec_id")
        ids = df["vec_id"].to_numpy(np.int64)
        m = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        norms = np.linalg.norm(m, axis=1)
        norms[norms == 0] = 1.0
        m = m / norms[:, None]
        n = len(ids)
        frames = []
        for lo in range(0, n, tile_rows):
            hi = min(lo + tile_rows, n)
            sims = m[lo:hi] @ m[lo:].T  # rows lo..hi vs the upper remainder
            ra, ca = np.nonzero(sims >= threshold)
            keep = (ra + lo) < (ca + lo)  # strict upper triangle (a < b)
            ra, ca = ra[keep], ca[keep]
            frames.append(pd.DataFrame(
                {"vec_a": ids[ra + lo], "vec_b": ids[ca + lo],
                 "cos_sim": round_half_away(sims[ra, ca], 4)}))
        out = pd.concat(frames, ignore_index=True) if frames else pd.DataFrame(
            {"vec_a": pd.Series([], dtype=np.int64),
             "vec_b": pd.Series([], dtype=np.int64),
             "cos_sim": pd.Series([], dtype=float)})
        return out

    def pairs_in_part(df: pd.DataFrame) -> pd.DataFrame:
        # hash-partition by label, ONE map_groups call per partition, then a
        # local loop over the partition's labels — Ray's per-group task
        # overhead is paid P times, not once per label (labels grow with
        # the corpus; isolated ABBA showed per-key map_groups is ~100x
        # slower at 45k keys)
        frames = [pairs_in_label(g)
                  for _, g in df.groupby("label", sort=False)]
        return pd.concat(frames, ignore_index=True) if frames else \
            pd.DataFrame({"vec_a": pd.Series([], dtype=np.int64),
                          "vec_b": pd.Series([], dtype=np.int64),
                          "cos_sim": pd.Series([], dtype=float)})

    from ..stages.partition import partitioned_map

    return partitioned_map(ds, pairs_in_part, key="label",
                           num_partitions=16)


def dup_spans(sf_dir: str, L: int = 16, num_partitions: int = 16):
    """EXACT duplicated-substring spans (the Lee et al. 2021 "Deduplicating
    Training Data" exact-substring family, gram-anchored): every maximal
    span of a document covered by length-``L`` substrings that occur
    verbatim in at least one OTHER document.  The family the shingle/MinHash
    ops approximate — this one is exact, at suffix-array-class cost.

    Plan: (1) explode all L-grams with positions (O(chars) slicing per row,
    the Fingerprinter discipline — md5/set work is factorized, the loop only
    slices); (2) ONE gram-hash shuffle co-locates every occurrence of a gram;
    a gram survives iff ≥ 2 DISTINCT docs carry it (grouped on the gram
    STRING, so hash collisions cannot create false spans); (3) the surviving
    (doc, pos) marks take the doc-hash shuffle and merge into maximal spans
    via vectorized gaps-and-islands (gap ≤ L ⇒ overlap or adjacency).

    Honest cost note: the gram shuffle moves one row per character — that IS
    the price of exactness (a suffix array moves the same order of data);
    the approximate families (minhash/winnow) exist precisely to avoid it.
    Returns ``(doc_id, span_start, span_end)``, 1-based inclusive."""
    import ray.data

    from ..stages.partition import partitioned_map

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        texts = df["text"].fillna("")
        n = np.maximum(texts.str.len().to_numpy(np.int64) - L + 1, 0)
        grams: list[str] = []
        for s, k in zip(texts, n):  # O(chars) slicing only
            grams.extend(s[i:i + L] for i in range(k))
        return pd.DataFrame({
            "gram": np.asarray(grams, dtype=object),
            "doc_id": np.repeat(df["doc_id"].to_numpy(np.int64), n),
            "pos": np.concatenate([np.arange(1, k + 1, dtype=np.int64)
                                   for k in n]) if n.sum() else
                np.zeros(0, np.int64),
        })

    def shared_marks(df: pd.DataFrame) -> pd.DataFrame:
        k = df.groupby("gram")["doc_id"].transform("nunique") > 1
        out = df[k]
        return pd.DataFrame({"doc_id": out["doc_id"].to_numpy(np.int64),
                             "pos": out["pos"].to_numpy(np.int64)})

    def merge_spans(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["doc_id", "pos"], kind="mergesort")
        doc = df["doc_id"].to_numpy(np.int64)
        pos = df["pos"].to_numpy(np.int64)
        brk = np.ones(len(df), bool)
        if len(df) > 1:
            brk[1:] = (doc[1:] != doc[:-1]) | (pos[1:] - pos[:-1] > L)
        gid = np.cumsum(brk)
        g = pd.DataFrame({"doc_id": doc, "gid": gid, "pos": pos}) \
            .groupby(["doc_id", "gid"])["pos"].agg(["min", "max"]) \
            .reset_index()
        return pd.DataFrame({"doc_id": g["doc_id"].to_numpy(np.int64),
                             "span_start": g["min"].to_numpy(np.int64),
                             "span_end": g["max"].to_numpy(np.int64) + L - 1})

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"]) \
        .map_batches(explode, batch_format="pandas", batch_size=1024)
    marks = partitioned_map(ds, shared_marks, key="gram",
                            num_partitions=num_partitions)
    return partitioned_map(marks, merge_spans, key="doc_id",
                           num_partitions=num_partitions)


def dup_spans_oracle_sql(L: int = 16) -> str:
    return f"""
        WITH docs AS (SELECT doc_id, coalesce(text, '') AS t FROM documents),
        g AS (SELECT doc_id, i, substring(t, i, {L}) AS gram
              FROM docs, UNNEST(generate_series(1, greatest(len(t) - {L - 1}, 0)))
                   AS s(i)),
        shared AS (SELECT gram FROM g
                   GROUP BY gram HAVING count(DISTINCT doc_id) > 1),
        m AS (SELECT g.doc_id, g.i FROM g JOIN shared USING (gram)),
        isl AS (SELECT doc_id, i,
                       CASE WHEN i - lag(i) OVER (PARTITION BY doc_id
                                                  ORDER BY i) <= {L}
                            THEN 0 ELSE 1 END AS brk
                FROM m),
        grp AS (SELECT doc_id, i,
                       sum(brk) OVER (PARTITION BY doc_id ORDER BY i
                                      ROWS UNBOUNDED PRECEDING) AS gid
                FROM isl)
        SELECT doc_id, min(i) AS span_start,
               max(i) + {L - 1} AS span_end
        FROM grp GROUP BY doc_id, gid"""


def semantic_dedup(sf_dir: str, threshold: float = 0.30):
    """SemDeDup-shaped semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): within-cluster embedding-cosine near-dup pairs →
    connected components → ONE representative (min ``vec_id``) per
    component.  Output: ``(vec_id, rep_id, kept)`` for EVERY vector —
    ``kept`` is the dedup keep list (representatives + singletons).

    Composition of the scale-shaped pieces: :func:`embedding_dup_pairs`
    (vectors shuffle once into label blocks, tiled matmuls inside) feeds
    :func:`connected_components` (hash-to-min label propagation — only the
    edge frontier shuffles, O(log diameter) rounds).  The driver holds only
    the near-dup PAIR list and the final (vec_id, rep) map — never the
    vectors (same boundedness contract as :func:`dedup_clusters`)."""
    ids = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                                columns=["vec_id"]).to_pandas()
    if not len(ids):
        return pd.DataFrame({"vec_id": pd.Series([], dtype=np.int64),
                             "rep_id": pd.Series([], dtype=np.int64),
                             "kept": pd.Series([], dtype=bool)})
    vec_ids = np.sort(ids["vec_id"].to_numpy(np.int64))
    pairs = embedding_dup_pairs(sf_dir, threshold).to_pandas()
    if len(pairs):
        edges = ray.data.from_pandas(pd.DataFrame({
            "u": pairs["vec_a"].to_numpy(np.int64),
            "v": pairs["vec_b"].to_numpy(np.int64)}))
        comp = connected_components(edges).to_pandas()
        rep = pd.Series(comp["label"].to_numpy(np.int64),
                        index=comp["node"].to_numpy(np.int64))
    else:
        rep = pd.Series([], dtype=np.int64)
    rep_ids = rep.reindex(vec_ids).fillna(
        pd.Series(vec_ids, index=vec_ids)).to_numpy(np.int64)
    return pd.DataFrame({"vec_id": vec_ids, "rep_id": rep_ids,
                         "kept": vec_ids == rep_ids})


def semantic_dedup_oracle_sql(threshold: float = 0.30) -> str:
    return f"""
        WITH RECURSIVE ed AS (
            SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb
            FROM embeddings),
        pairs AS (
            SELECT a.vec_id AS u, b.vec_id AS v
            FROM ed a JOIN ed b
              ON a.label = b.label AND a.vec_id < b.vec_id
            WHERE list_cosine_similarity(a.emb, b.emb) >= {threshold}),
        edges AS (SELECT u, v FROM pairs UNION SELECT v, u FROM pairs),
        reach(node, lab) AS (
            SELECT vec_id, vec_id FROM embeddings
            UNION
            SELECT e.v, r.lab FROM reach r JOIN edges e ON e.u = r.node)
        SELECT node AS vec_id, min(lab) AS rep_id,
               (node = min(lab)) AS kept
        FROM reach GROUP BY node"""

def _levenshtein(a: str, b: str) -> int:
    """Exact edit distance, row-vectorized DP: each row update is two
    np.minimum kernels plus one min-plus prefix scan
    (``minimum.accumulate(v - j) + j`` resolves the serial left-to-right
    insertion dependency), so the inner loop is O(len_a) numpy ops instead
    of O(len_a x len_b) Python steps.  Code-point semantics match DuckDB's
    ``levenshtein``."""
    if a == b:
        return 0
    la, lb = len(a), len(b)
    if la == 0 or lb == 0:
        return max(la, lb)
    ca = np.frombuffer(a.encode("utf-32-le"), dtype=np.uint32)
    cb = np.frombuffer(b.encode("utf-32-le"), dtype=np.uint32)
    j = np.arange(lb + 1, dtype=np.int64)
    prev = j.copy()
    for i in range(1, la + 1):
        t = np.minimum(prev[1:] + 1, prev[:-1] + (cb != ca[i - 1]))
        u = np.concatenate(([np.int64(i)], t))
        prev = np.minimum.accumulate(u - j) + j
    return int(prev[-1])


_INF32 = np.int32(1 << 30)


def _levenshtein_band(arrs_a: list[np.ndarray], arrs_b: list[np.ndarray],
                      caps: np.ndarray | None = None,
                      band_width: int = 64) -> np.ndarray:
    """Levenshtein for MANY pairs at once — vectorized ACROSS pairs AND
    Ukkonen-banded (public algorithm: Ukkonen 1985, "Algorithms for
    approximate string matching"): with a per-pair distance cap only the
    ``|i − j| ≤ k`` diagonal band of the DP matrix can matter, so each row
    touches ``2k+1`` cells instead of ``len(b)``.

    Pairs are grouped into ``band_width``-wide buckets of ``len(a)`` (the
    DP iteration count); each bucket runs ONE (n_pairs × 2k+1) windowed DP
    with ``k = max(cap, |len gap|)`` over the bucket, the window sliding
    one column per row so the insertion recurrence stays the row-wise
    min-accumulate trick of :func:`_levenshtein`.  Each pair's answer is
    harvested the moment ``i`` reaches its own ``len(a)``.

    Returned distances are EXACT for any pair whose true distance is
    ≤ its cap; above the cap the band may clamp the value (callers filter
    ``d <= cap``, so clamped pairs are correctly rejected).  With
    ``caps=None`` the band covers the full matrix and every distance is
    exact.  ``arrs_a[p]`` should be the shorter side (the metric is
    symmetric; callers swap) — it minimizes iterations."""
    n = len(arrs_a)
    las = np.array([len(a) for a in arrs_a], dtype=np.int64)
    lbs = np.array([len(b) for b in arrs_b], dtype=np.int64)
    out = np.zeros(n, dtype=np.int64)
    out[las == 0] = lbs[las == 0]  # empty short side: distance = |b|
    if caps is None:
        caps = np.maximum(las, lbs)
    live = np.flatnonzero(las > 0)
    if not len(live):
        return out
    # Per-pair band need; bucket by BOTH the iteration count and the band
    # width so one wide-cap pair doesn't inflate w for a whole length bucket.
    ks = np.maximum(np.ceil(caps[live]).astype(np.int64),
                    np.abs(lbs[live] - las[live]))
    buckets = (las[live] - 1) // band_width * 1024 + ks // 32
    for bkt in np.unique(buckets):
        idx = live[buckets == bkt]
        la_g, lb_g = las[idx], lbs[idx]
        g = len(idx)
        la_max = int(la_g.max())
        k = int(ks[buckets == bkt].max())
        w = 2 * k + 1
        maxlb = int(lb_g.max())
        amat = np.zeros((g, la_max), np.uint32)
        bmat = np.full((g, maxlb + 1), np.uint32(0xFFFFFFFF))
        for r in range(g):  # ragged copy; the windowed DP is the hot part
            amat[r, : la_g[r]] = arrs_a[idx[r]]
            bmat[r, : lb_g[r]] = arrs_b[idx[r]]
        o = np.arange(w, dtype=np.int64)
        lbc = lb_g[:, None]
        j0 = o[None, :] - k  # row 0: D[0, j] = j inside the band
        prev = np.where((j0 >= 0) & (j0 <= lbc), j0, _INF32).astype(np.int32)
        rej = np.floor(caps[idx]).astype(np.int64) + 1  # any value > cap
        i = 1
        while i <= la_max:
            jm = (i + o - k)[None, :]  # window → matrix columns, this row
            ji = jm.astype(np.int32)
            valid = (jm >= 0) & (jm <= lbc)
            bch = bmat[np.arange(g)[:, None], np.clip(jm - 1, 0, maxlb)]
            sub = prev + (bch != amat[:, i - 1][:, None])
            dele = np.concatenate(
                [prev[:, 1:], np.full((g, 1), _INF32, np.int32)], axis=1) + 1
            cand = np.minimum(sub, dele)
            cand = np.where(jm == 0, np.int32(i), cand)  # first column
            acc = np.minimum.accumulate(cand - ji, axis=1) + ji  # insertions
            prev = np.where(valid, acc, _INF32).astype(np.int32)
            done = la_g == i
            if done.any():
                out[idx[done]] = prev[np.flatnonzero(done), lb_g[done] - i + k]
            i += 1
            # Ukkonen cutoff: the row minimum is non-decreasing in i (every
            # cell ≥ the min of its predecessors), so a pair whose banded row
            # min already exceeds its cap can only end above the cap — mark
            # it rejected and compact it out of the bucket every 32 rows.
            if i <= la_max and (i & 31) == 0:
                rowmin = np.where(prev >= _INF32, _INF32, prev).min(axis=1)
                dead = (rowmin > caps[idx]) & (la_g >= i)
                if dead.any():
                    out[idx[dead]] = rej[dead]
                    keep_r = ~dead & (la_g >= i)
                    if not keep_r.any():
                        break
                    idx, la_g, lb_g = idx[keep_r], la_g[keep_r], lb_g[keep_r]
                    amat, bmat = amat[keep_r], bmat[keep_r]
                    prev, lbc, rej = prev[keep_r], lb_g[:, None], rej[keep_r]
                    g = len(idx)
    return out


_EMPTY_EDIT = {"doc_a": pd.Series([], dtype=np.int64),
               "doc_b": pd.Series([], dtype=np.int64),
               "dist": pd.Series([], dtype=np.int64)}


def edit_dup_pairs(sf_dir: str, rel_threshold: float = 0.2,
                   num_partitions: int = 16, bloom_bits: int = 1 << 22):
    """Edit-distance near-dup pairs: winnow-sketch collision blocking
    (:func:`winnow_dup_pairs` — the cheapest candidate generator, one
    scalar per doc) verified by exact LEVENSHTEIN distance with a relative
    threshold ``dist <= rel * max(len_a, len_b)`` — the string-metric
    family (token-set Jaccard, bit-Hamming SimHash and embedding cosine
    are the other verify metrics; edit distance catches small in-place
    edits those miss).

    FULLY CLUSTER-SIDE: the candidate pairs stay a Dataset end-to-end —
    deduped by the shared pair-key shuffle (:func:`_dedup_pairs`), routed
    to verify partitions by the canonical pair hash, and co-shuffled with
    the texts they reference.  The driver holds only a FIXED-SIZE Bloom
    filter (``bloom_bits`` bits, built from mergeable per-batch partials)
    that prunes the documents scan to ~the referenced ids before the
    doc_id co-partition joins texts to needs (Bloom false positives are
    dropped exactly there); a second union shuffle co-locates each verify
    partition's pairs with its replicated texts.  Neither the pair list
    nor any text ever lands on the driver, so a boilerplate-heavy corpus
    whose candidate list outgrows driver memory still runs.  Verification
    is the banded multi-pair DP (:func:`_levenshtein_band`) — vectorized
    across pairs, not a per-pair Python loop — after the
    ``|len_a − len_b|`` length-gap prefilter (it lower-bounds the
    distance)."""
    from ..functions.bloom import Bloom, bloom_from_dataset

    cand = _dedup_pairs(winnow_dup_pairs(sf_dir,
                                         num_partitions=num_partitions),
                        num_partitions=num_partitions)

    def add_vp(df: pd.DataFrame) -> pd.DataFrame:
        pk = pd.util.hash_pandas_object(
            df["doc_a"].astype(np.int64) * np.int64(1_000_003)
            ^ df["doc_b"].astype(np.int64), index=False).to_numpy()
        return pd.DataFrame({"vp": (pk % num_partitions).astype(np.int32),
                             "doc_a": df["doc_a"].to_numpy(np.int64),
                             "doc_b": df["doc_b"].to_numpy(np.int64)})

    # materialize the DEDUPED pair list (3 narrow int columns, bounded by
    # the winnow bucket caps): it feeds three consumers (the Bloom build,
    # the needs side of shuffle 1 and the pair side of shuffle 2), and a
    # lazy Dataset would re-run the whole fingerprint+dedup lineage per
    # consumer.  Blocks stay in the (spillable) object store — the driver
    # never reads them.
    pairs = cand.map_batches(add_vp, batch_format="pandas").materialize()

    def to_needs(df: pd.DataFrame) -> pd.DataFrame:
        return pd.concat([
            df[["doc_a", "vp"]].rename(columns={"doc_a": "doc_id"}),
            df[["doc_b", "vp"]].rename(columns={"doc_b": "doc_id"}),
        ]).drop_duplicates()  # batch-local; exact dedup happens at the merge

    needs = pairs.map_batches(to_needs, batch_format="pandas")

    # fixed-size Bloom of referenced ids: the ONLY candidate-derived state
    # on the driver, m/8 bytes regardless of pair count
    bloom = bloom_from_dataset(needs, "doc_id", m_bits=bloom_bits, k=6)
    bits_ref = ray.put(bloom.bits.tobytes())

    def doc_filter(t: pa.Table) -> pa.Table:
        bl = Bloom(bloom_bits, 6,
                   bits=np.frombuffer(ray.get(bits_ref), np.uint8))
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.filter(pa.array(bl.contains(ids))).select(["doc_id", "text"])

    docs = _read_docs(sf_dir).map_batches(doc_filter, batch_format="pyarrow",
                                          zero_copy_batch=True)

    # shuffle 1 — co-partition (Bloom-pruned) texts with needs by doc_id;
    # the inner merge is the exact filter that drops Bloom false positives
    def u_docs(t: pa.Table) -> pa.Table:
        n = len(t)
        return pa.table({"doc_id": t["doc_id"].cast(pa.int64()),
                         "side": pa.array(np.zeros(n, np.int8)),
                         "vp": pa.nulls(n, pa.int32()),
                         "text": t["text"]})

    def u_needs(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"doc_id": df["doc_id"].to_numpy(np.int64),
                             "side": np.ones(len(df), np.int8),
                             "vp": df["vp"].to_numpy(np.int32),
                             "text": pd.Series([None] * len(df), dtype=object)})

    u1 = docs.map_batches(u_docs, batch_format="pyarrow",
                          zero_copy_batch=True) \
        .union(needs.map_batches(u_needs, batch_format="pandas"))
    u1 = add_partition_column(u1, key="doc_id",
                              num_partitions=num_partitions)

    def replicate(df: pd.DataFrame) -> pd.DataFrame:
        tx = df[df["side"] == 0][["doc_id", "text"]]
        nd = df[df["side"] == 1][["doc_id", "vp"]].drop_duplicates()
        m = nd.merge(tx, on="doc_id", how="inner")
        return pd.DataFrame({"vp": m["vp"].to_numpy(np.int32),
                             "doc_id": m["doc_id"].to_numpy(np.int64),
                             "text": m["text"]})

    reps = u1.groupby("part").map_groups(replicate, batch_format="pandas")

    # shuffle 2 — co-locate each verify partition's pairs with its texts
    def u_reps(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"vp": df["vp"].to_numpy(np.int32),
                             "side": np.zeros(len(df), np.int8),
                             "doc_a": np.zeros(len(df), np.int64),
                             "doc_b": np.zeros(len(df), np.int64),
                             "doc_id": df["doc_id"].to_numpy(np.int64),
                             "text": df["text"]})

    def u_pairs(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"vp": df["vp"].to_numpy(np.int32),
                             "side": np.ones(len(df), np.int8),
                             "doc_a": df["doc_a"].to_numpy(np.int64),
                             "doc_b": df["doc_b"].to_numpy(np.int64),
                             "doc_id": np.zeros(len(df), np.int64),
                             "text": pd.Series([None] * len(df),
                                               dtype=object)})

    u2 = reps.map_batches(u_reps, batch_format="pandas") \
        .union(pairs.map_batches(u_pairs, batch_format="pandas"))

    def verify_block(g: pd.DataFrame) -> pd.DataFrame:
        p = g[g["side"] == 1]
        tx = g[g["side"] == 0]
        if not len(p):
            return pd.DataFrame(_EMPTY_EDIT)
        chars = {int(d): np.frombuffer(
                     (t if isinstance(t, str) else "").encode("utf-32-le"),
                     dtype=np.uint32)
                 for d, t in zip(tx["doc_id"], tx["text"])}
        empty = np.zeros(0, np.uint32)
        da = p["doc_a"].to_numpy(np.int64)
        db = p["doc_b"].to_numpy(np.int64)
        A = [chars.get(int(a), empty) for a in da]
        B = [chars.get(int(b), empty) for b in db]
        lens = np.array([[len(x), len(y)] for x, y in zip(A, B)], np.int64) \
            .reshape(-1, 2)
        budget = rel_threshold * lens.max(axis=1)
        keep = (lens.max(axis=1) - lens.min(axis=1)) <= budget
        if not keep.any():
            return pd.DataFrame(_EMPTY_EDIT)
        ki = np.flatnonzero(keep)
        # Counting filter (Jokinen & Ukkonen 1991): every edit op moves the
        # character histogram by L1 ≤ 2, so dist ≥ ⌈L1(hist_a, hist_b)/2⌉ —
        # and projecting code points into 128 buckets only merges bins,
        # which can't increase L1, so the bound survives the projection.
        # Winnow collisions are mostly unrelated texts, so this one
        # vectorized pass kills the vast majority of pairs before the DP.
        zh = np.zeros(128, np.int64)
        hists = {d: np.bincount(c & np.uint32(127),
                                minlength=128).astype(np.int64)
                 for d, c in chars.items()}
        ha = np.stack([hists.get(int(a), zh) for a in da[ki]])
        hb = np.stack([hists.get(int(b), zh) for b in db[ki]])
        l1 = np.abs(ha - hb).sum(axis=1)
        ki = ki[(l1 + 1) // 2 <= budget[ki]]
        if not len(ki):
            return pd.DataFrame(_EMPTY_EDIT)
        # shorter side first: the band key is the DP iteration count
        swap = lens[ki, 0] > lens[ki, 1]
        arrs_a = [B[i] if s else A[i] for i, s in zip(ki, swap)]
        arrs_b = [A[i] if s else B[i] for i, s in zip(ki, swap)]
        d = _levenshtein_band(arrs_a, arrs_b, caps=budget[ki])
        ok = d <= budget[ki]
        return pd.DataFrame({"doc_a": da[ki][ok], "doc_b": db[ki][ok],
                             "dist": d[ok]})

    out = u2.groupby("vp").map_groups(verify_block,
                                      batch_format="pandas").to_pandas()
    if not len(out.columns) or not len(out):
        return pd.DataFrame(_EMPTY_EDIT)
    return out.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)

def dedup_keep_best(sf_dir: str, threshold: float = 0.5, clusters=None):
    """Near-dup clusters with a QUALITY keep rule: instead of
    :func:`dedup_clusters`' min-doc_id representative, each cluster keeps
    its highest-quality member (most whitespace tokens; ties to the lowest
    doc_id) — what production dedup actually does before dropping rows
    (the rep is an arbitrary label; the SURVIVOR is a policy decision).

    Output: one row per cluster ``(rep_id, kept_doc_id, n_members,
    kept_ws_tokens)``.  The token counts are computed ONLY for clustered
    docs (the clustered id set broadcasts once; each batch scores its own
    members) — the corpus never re-shuffles for the keep rule."""
    if clusters is None:
        clusters = dedup_clusters(sf_dir, threshold)
    if not len(clusters):
        return pd.DataFrame({"rep_id": pd.Series([], dtype=np.int64),
                             "kept_doc_id": pd.Series([], dtype=np.int64),
                             "n_members": pd.Series([], dtype=np.int64),
                             "kept_ws_tokens": pd.Series([], dtype=np.int64)})
    ref = ray.put(set(int(d) for d in clusters["doc_id"]))

    def score(df: pd.DataFrame) -> pd.DataFrame:
        member = ray.get(ref)
        df = df[df["doc_id"].isin(member)]
        ws = df["text"].fillna("").str.split().str.len()
        return pd.DataFrame({"doc_id": df["doc_id"].to_numpy(np.int64),
                             "ws": ws.to_numpy(np.int64)})

    scores = _read_docs(sf_dir).map_batches(score, batch_format="pandas") \
        .to_pandas()  # bounded: clustered docs only (near-dup pair members)
    m = clusters.merge(scores, on="doc_id")
    m = m.sort_values(["rep_id", "ws", "doc_id"],
                      ascending=[True, False, True], kind="mergesort")
    top = m.drop_duplicates("rep_id")
    size = m.groupby("rep_id", sort=True).size()
    return pd.DataFrame({
        "rep_id": top["rep_id"].to_numpy(np.int64),
        "kept_doc_id": top["doc_id"].to_numpy(np.int64),
        "n_members": size.reindex(top["rep_id"]).to_numpy(np.int64),
        "kept_ws_tokens": top["ws"].to_numpy(np.int64),
    }).sort_values("rep_id").reset_index(drop=True)
