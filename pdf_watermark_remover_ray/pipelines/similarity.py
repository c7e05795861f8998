"""Similarity search over the ``embeddings`` table.

- :func:`ann_topk` — brute-force cosine top-k: the query matrix is broadcast
  once (``ray.put``), every batch computes a (batch × queries) matmul and
  emits its LOCAL top-k per query; the driver merges the tiny partials.
  At 100 TB this is the exact-scan baseline: no shuffle, one pass, partial
  top-k keeps the reduce O(queries × k × blocks).
- :func:`ann_topk_lsh` — the scale path: multi-table multiprobe
  random-hyperplane LSH (:class:`MultiLSH`); only corpus vectors within
  Hamming 1 of a query's signature in at least one table are scored.
  Approximate (recall vs candidate-fraction recorded in BASELINE.md),
  much less compute per query than the exact scan.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from ..functions.rounding import round_half_away


def _load_queries(sf_dir: str, n_queries: int) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic query workload: the n_queries lowest vec_ids."""
    import duckdb

    con = duckdb.connect()
    q = con.sql(
        f"SELECT vec_id, embedding FROM read_parquet('{sf_dir}/embeddings.parquet') "
        f"ORDER BY vec_id LIMIT {n_queries}"
    ).df()
    con.close()
    qm = np.stack(q["embedding"].to_numpy()).astype(np.float64)
    norms = np.linalg.norm(qm, axis=1)
    norms[norms == 0] = 1.0
    return q["vec_id"].to_numpy(np.int64), qm / norms[:, None]


def ann_topk(sf_dir: str, n_queries: int = 10, k: int = 5):
    """Exact cosine top-k neighbours for the query set (excluding self)."""
    qids, qm = _load_queries(sf_dir, n_queries)
    q_ref = ray.put((qids, qm))

    def local_topk(df: pd.DataFrame) -> pd.DataFrame:
        qids_, qm_ = ray.get(q_ref)
        ids = df["vec_id"].to_numpy(np.int64)
        m = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        norms = np.linalg.norm(m, axis=1)
        norms[norms == 0] = 1.0
        m = m / norms[:, None]
        sims = qm_ @ m.T  # (Q, B)
        out = []
        for qi in range(len(qids_)):
            s = sims[qi].copy()
            s[ids == qids_[qi]] = -np.inf  # exclude self
            take = min(k, len(ids))
            idx = np.argpartition(-s, take - 1)[:take]
            out.append(pd.DataFrame({"query_id": qids_[qi], "vec_id": ids[idx],
                                     "cos_sim": s[idx]}))
        return pd.concat(out, ignore_index=True)

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding"])
    partials = ds.map_batches(local_topk, batch_format="pandas", batch_size=4096) \
        .to_pandas()
    # tiny driver-side merge: global top-k per query, ties → lower vec_id
    partials = partials.sort_values(["query_id", "cos_sim", "vec_id"],
                                    ascending=[True, False, True], kind="mergesort")
    out = partials.groupby("query_id", sort=True).head(k).reset_index(drop=True)
    out["cos_sim"] = round_half_away(out["cos_sim"], 4)
    return out[["query_id", "vec_id", "cos_sim"]]


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (public domain constant mix) — a
    uniform uint64 hash of int64 keys with no per-row Python."""
    z = (x.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15))
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def _sample_embeddings(sf_dir: str, n: int = 512, seed: int = 42) -> np.ndarray:
    """Dataset-native deterministic sample for centroid training: every batch
    keeps its ``n`` smallest ``splitmix64(vec_id ^ seed)`` rows, the driver
    merges the tiny partials and keeps the global ``n`` smallest — the same
    partial-top-k pattern as :func:`ann_topk` (one streaming pass, no
    shuffle, O(n × blocks) driver merge).  Hash-ordered selection ⇒ a
    uniform sample that is identical under ANY partitioning / block order,
    unlike an order-dependent reservoir.

    The rank hash is an md5 prefix of ``"{vec_id}:{seed}"`` so the DuckDB
    oracle can replay the exact sample (the repo's standard SQL-replayable
    hash, :func:`..functions.hashing.md5_u64`); ties (impossible at 64
    bits in practice) break on ``vec_id``.  Returns L2-normalized float64
    ROUNDED to 9 dp — the fixed-point contract that keeps the downstream
    k-means (IVF centroids, PQ codebooks) bit-replayable in SQL: every
    centroid update rounds to 9 dp, so 1e-16 summation-order noise between
    numpy and DuckDB cannot cascade through iterations.  Rows come back in
    hash order, which downstream trainers use as their deterministic
    initial-centroid order."""
    from ..functions.hashing import md5_u64

    def pick(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["vec_id"].to_numpy(np.int64)
        h = md5_u64(np.array([f"{v}:{seed}" for v in ids], dtype=object))
        take = min(n, len(df))
        order = np.lexsort((ids, h))[:take]
        return pd.DataFrame({"h": h[order], "vec_id": ids[order],
                             "embedding": df["embedding"].to_numpy()[order]})

    parts = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                                  columns=["vec_id", "embedding"]) \
        .map_batches(pick, batch_format="pandas", batch_size=4096).to_pandas()
    parts = parts.sort_values(["h", "vec_id"], kind="mergesort").head(n)
    sm = np.stack(parts["embedding"].to_numpy()).astype(np.float64)
    norms = np.linalg.norm(sm, axis=1)
    norms[norms == 0] = 1.0
    return round_half_away(sm / norms[:, None], 9)


class IVFIndex:
    """Tiny IVF (inverted-file) index: k-means centroids trained on a sample,
    corpus bucketed by nearest centroid, queries probe the nearest
    ``nprobe`` buckets.

    Fully SQL-replayable (the DuckDB oracle re-runs the training): initial
    centroids are the first ``n_lists`` rows of the hash-ordered sample
    (hash order is already pseudorandom — an rng pick adds nothing and
    would depend on the sample SIZE); every assignment argmax reads scores
    ROUNDED to 9 dp with ties to the lowest centroid id, and every centroid
    update is the spherical-k-means normalize-then-round step, so numpy and
    DuckDB stay bit-identical through all ``iters`` iterations."""

    def __init__(self, sample: np.ndarray, n_lists: int = 16, iters: int = 10,
                 seed: int = 42) -> None:
        self.centroids = sample[:min(n_lists, len(sample))].copy()
        for _ in range(iters):
            assign = self.assign(sample)
            for c in range(len(self.centroids)):
                members = sample[assign == c]
                if len(members):
                    v = members.mean(axis=0)
                    norm = np.linalg.norm(v)
                    if norm > 0:
                        self.centroids[c] = round_half_away(v / norm, 9)

    def assign(self, m: np.ndarray) -> np.ndarray:
        # first max on ties == lowest centroid id, matching the SQL replay
        return np.argmax(round_half_away(m @ self.centroids.T, 9), axis=1)

    def probe(self, q: np.ndarray, nprobe: int) -> np.ndarray:
        sims = round_half_away(q @ self.centroids.T, 9)
        order = np.lexsort((np.arange(len(sims)), -sims))
        return order[:nprobe]


def ann_topk_ivf(sf_dir: str, n_queries: int = 10, k: int = 5, n_lists: int = 16,
                 nprobe: int = 4):
    """IVF approximate top-k: centroids trained once on a Dataset-native
    hash-ordered sample (:func:`_sample_embeddings` — no non-Ray scan in the
    build), broadcast; each batch scores only vectors whose cluster is probed
    by a query.  At 100 TB the cluster id becomes a partition column so probes
    touch only the matching partitions' files (partition pruning at the
    read); here the index rides the batch pass."""
    qids, qm = _load_queries(sf_dir, n_queries)
    index = IVFIndex(_sample_embeddings(sf_dir, n=512, seed=42),
                     n_lists=n_lists)
    probes = {int(qids[i]): index.probe(qm[i], nprobe) for i in range(len(qids))}
    ref = ray.put((qids, qm, probes, index))

    def local_topk(df: pd.DataFrame) -> pd.DataFrame:
        qids_, qm_, probes_, index_ = ray.get(ref)
        ids = df["vec_id"].to_numpy(np.int64)
        m = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        norms = np.linalg.norm(m, axis=1)
        norms[norms == 0] = 1.0
        mn = m / norms[:, None]
        clusters = index_.assign(mn)
        out = []
        for qi in range(len(qids_)):
            probe_set = probes_[int(qids_[qi])]
            cand = np.flatnonzero(np.isin(clusters, probe_set) & (ids != qids_[qi]))
            if len(cand) == 0:
                continue
            s = mn[cand] @ qm_[qi]
            # total order (cos desc, vec_id asc): local top-k + driver merge
            # is batch-boundary invariant even with duplicate vectors
            idx = np.lexsort((ids[cand], -s))[:min(k, len(cand))]
            out.append(pd.DataFrame({"query_id": qids_[qi], "vec_id": ids[cand[idx]],
                                     "cos_sim": s[idx]}))
        return pd.concat(out, ignore_index=True) if out else pd.DataFrame(
            {"query_id": pd.Series([], dtype=np.int64),
             "vec_id": pd.Series([], dtype=np.int64),
             "cos_sim": pd.Series([], dtype=float)})

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding"])
    partials = ds.map_batches(local_topk, batch_format="pandas", batch_size=4096) \
        .to_pandas()
    partials = partials.sort_values(["query_id", "cos_sim", "vec_id"],
                                    ascending=[True, False, True], kind="mergesort")
    out = partials.groupby("query_id", sort=True).head(k).reset_index(drop=True)
    out["cos_sim"] = round_half_away(out["cos_sim"], 4)
    return out[["query_id", "vec_id", "cos_sim"]]


def ivf_build(sf_dir: str, index_dir: str, n_lists: int = 16,
              seed: int = 42) -> "IVFIndex":
    """Materialize the IVF clustered layout: embeddings written as ONE
    parquet dir per cluster (``index_dir/cluster={c}/data.parquet``) plus
    the centroid matrix — the cluster id as a PHYSICAL partition column, so
    a probed query reads only its clusters' files (partition pruning at the
    read; at 100 TB the unprobed ~ (1 - nprobe/n_lists) of the corpus never
    leaves storage).  Deterministic (fixed seed) and resumable (write-once
    per cluster via the batch sink discipline)."""
    import pyarrow.parquet as pq_

    index = IVFIndex(_sample_embeddings(sf_dir, n=512, seed=seed),
                     n_lists=n_lists, seed=seed)
    os.makedirs(index_dir, exist_ok=True)
    cpath = os.path.join(index_dir, "centroids.npy")
    if not os.path.exists(cpath):
        tmp = cpath + ".tmp.npy"
        np.save(tmp, index.centroids)
        os.replace(tmp, cpath)
    idx_ref = ray.put(index)

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        ix = ray.get(idx_ref)
        m = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        nr = np.linalg.norm(m, axis=1)
        nr[nr == 0] = 1.0
        df = df.copy()
        df["cluster"] = ix.assign(m / nr[:, None]).astype(np.int32)
        return df

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding"])
    clustered = ds.map_batches(assign, batch_format="pandas")

    def write_cluster(df: pd.DataFrame) -> pd.DataFrame:
        c = int(df["cluster"].iloc[0])
        d = os.path.join(index_dir, f"cluster={c}")
        os.makedirs(d, exist_ok=True)
        final = os.path.join(d, "data.parquet")
        if not os.path.exists(final):  # write-once: rebuild skips done clusters
            staging = final + ".staging"
            body = df.drop(columns=["cluster"]).sort_values("vec_id")
            pq_.write_table(pa.Table.from_pandas(body, preserve_index=False),
                            staging)
            os.replace(staging, final)
        return pd.DataFrame({"cluster": [c], "rows": [len(df)]})

    clustered.groupby("cluster").map_groups(
        write_cluster, batch_format="pandas").materialize()
    return index


def ann_topk_ivf_clustered(sf_dir: str, index_dir: str | None = None,
                           n_queries: int = 10, k: int = 5, n_lists: int = 16,
                           nprobe: int = 4):
    """IVF top-k over the CLUSTERED layout: the probed clusters' parquet
    dirs are the only files opened — the physical-partition-pruning variant
    of :func:`ann_topk_ivf` (identical results by construction: same
    centroids, same probes, same scoring; asserted in tests)."""
    import tempfile

    qids, qm = _load_queries(sf_dir, n_queries)
    own_tmp = index_dir is None
    if own_tmp:
        index_dir = tempfile.mkdtemp(prefix="pwr_ivf_")
    try:
        index = ivf_build(sf_dir, index_dir, n_lists=n_lists)
        probes = {int(qids[i]): index.probe(qm[i], nprobe)
                  for i in range(len(qids))}
        probed_union = sorted({int(c) for ps in probes.values() for c in ps})
        files = [os.path.join(index_dir, f"cluster={c}", "data.parquet")
                 for c in probed_union]
        files = [f for f in files if os.path.exists(f)]  # empty clusters
        ref = ray.put((qids, qm, probes, index))

        def local_topk(df: pd.DataFrame) -> pd.DataFrame:
            qids_, qm_, probes_, index_ = ray.get(ref)
            ids = df["vec_id"].to_numpy(np.int64)
            m = np.stack(df["embedding"].to_numpy()).astype(np.float64)
            nr = np.linalg.norm(m, axis=1)
            nr[nr == 0] = 1.0
            mn = m / nr[:, None]
            clusters = index_.assign(mn)
            out = []
            for qi in range(len(qids_)):
                cand = np.flatnonzero(
                    np.isin(clusters, probes_[int(qids_[qi])])
                    & (ids != qids_[qi]))
                if len(cand) == 0:
                    continue
                s = mn[cand] @ qm_[qi]
                idx = np.lexsort((ids[cand], -s))[:min(k, len(cand))]
                out.append(pd.DataFrame(
                    {"query_id": qids_[qi], "vec_id": ids[cand[idx]],
                     "cos_sim": s[idx]}))
            return pd.concat(out, ignore_index=True) if out else pd.DataFrame(
                {"query_id": pd.Series([], dtype=np.int64),
                 "vec_id": pd.Series([], dtype=np.int64),
                 "cos_sim": pd.Series([], dtype=float)})

        partials = ray.data.read_parquet(files) \
            .map_batches(local_topk, batch_format="pandas", batch_size=4096) \
            .to_pandas()
        partials = partials.sort_values(["query_id", "cos_sim", "vec_id"],
                                        ascending=[True, False, True],
                                        kind="mergesort")
        out = partials.groupby("query_id", sort=True).head(k).reset_index(drop=True)
        out["cos_sim"] = round_half_away(out["cos_sim"], 4)
        return out[["query_id", "vec_id", "cos_sim"]]
    finally:
        if own_tmp:
            import shutil

            shutil.rmtree(index_dir, ignore_errors=True)


class HyperplaneLSH:
    """Random-hyperplane signatures: sign bits of (v · H) as a bucket key."""

    def __init__(self, dim: int = 64, n_planes: int = 8, seed: int = 42) -> None:
        rng = np.random.default_rng(seed)
        self.h = rng.standard_normal((dim, n_planes))

    def key(self, m: np.ndarray) -> np.ndarray:
        bits = (m @ self.h) > 0
        return (bits.astype(np.int64) << np.arange(bits.shape[1], dtype=np.int64)).sum(axis=1)


class MultiLSH:
    """``n_tables`` INDEPENDENT hyperplane tables with multiprobe acceptance:
    a corpus vector is a candidate for a query when, in ANY table, their
    sign-bit signatures differ by at most ``max_hamming`` bits (flipping up
    to ``max_hamming`` query bits and OR-ing the probed buckets is exactly a
    Hamming-ball membership test, evaluated here with one XOR + popcount-LUT
    per (vector, query, table) — no bucket enumeration).

    Single-table/exact-bucket LSH (the old default) had recall@5 = 0.08: one
    6-bit table sees ~1/64 of the corpus and misses any neighbour that flips
    one plane.  Tables OR their candidate sets, multiprobe forgives near-
    boundary flips; both multiply recall while the candidate fraction stays
    bounded by n_tables × ball/2^n_planes."""

    def __init__(self, dim: int = 64, n_planes: int = 8, n_tables: int = 8,
                 seed: int = 42) -> None:
        rng = np.random.default_rng(seed)
        self.h = rng.standard_normal((n_tables, dim, n_planes))
        self.n_planes = n_planes
        # popcount lookup over the n_planes-bit key space (≤ 65536 entries)
        self.popcount = np.array([bin(i).count("1")
                                  for i in range(1 << n_planes)], np.uint8)

    def keys(self, m: np.ndarray) -> np.ndarray:
        """(n, n_tables) int64 signature matrix."""
        w = np.int64(1) << np.arange(self.n_planes, dtype=np.int64)
        out = np.empty((len(m), len(self.h)), np.int64)
        for t in range(len(self.h)):
            out[:, t] = ((m @ self.h[t]) > 0) @ w
        return out

    def candidate_mask(self, keys: np.ndarray, qkeys_row: np.ndarray,
                       max_hamming: int) -> np.ndarray:
        """Bool mask over corpus ``keys`` (n, T) vs ONE query's (T,) keys."""
        return (self.popcount[keys ^ qkeys_row[None, :]]
                <= max_hamming).any(axis=1)


def ann_topk_lsh(sf_dir: str, n_queries: int = 10, k: int = 5,
                 n_planes: int = 10, n_tables: int = 16, max_hamming: int = 1):
    """Multi-table multiprobe LSH approximate top-k: score only corpus
    vectors within Hamming ``max_hamming`` of a query's signature in at
    least one of ``n_tables`` hyperplane tables.  Emits the same schema as
    :func:`ann_topk` (possibly fewer than k rows per query when the
    candidate set is small).  Recall/candidate-fraction trade-off is
    recorded in BASELINE.md ("IVF index hygiene")."""
    qids, qm = _load_queries(sf_dir, n_queries)
    lsh = MultiLSH(dim=qm.shape[1], n_planes=n_planes, n_tables=n_tables)
    qkeys = lsh.keys(qm)  # (Q, T)
    ref = ray.put((qids, qm, qkeys, lsh))

    def local_topk2(df: pd.DataFrame) -> pd.DataFrame:
        qids_, qm_, qkeys_, lsh_ = ray.get(ref)
        ids = df["vec_id"].to_numpy(np.int64)
        m = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        norms = np.linalg.norm(m, axis=1)
        norms[norms == 0] = 1.0
        mn = m / norms[:, None]
        keys = lsh_.keys(mn)  # (B, T)
        out = []
        for qi in range(len(qids_)):
            cand = np.flatnonzero(
                lsh_.candidate_mask(keys, qkeys_[qi], max_hamming)
                & (ids != qids_[qi]))
            if len(cand) == 0:
                continue
            s = mn[cand] @ qm_[qi]
            take = min(k, len(cand))
            idx = np.argpartition(-s, take - 1)[:take]
            out.append(pd.DataFrame({"query_id": qids_[qi], "vec_id": ids[cand[idx]],
                                     "cos_sim": s[idx]}))
        return pd.concat(out, ignore_index=True) if out else pd.DataFrame(
            {"query_id": pd.Series([], dtype=np.int64),
             "vec_id": pd.Series([], dtype=np.int64),
             "cos_sim": pd.Series([], dtype=float)})

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding"])
    partials = ds.map_batches(local_topk2, batch_format="pandas", batch_size=4096) \
        .to_pandas()
    if "cos_sim" not in partials.columns:  # zero candidates anywhere
        partials = pd.DataFrame({"query_id": pd.Series([], dtype=np.int64),
                                 "vec_id": pd.Series([], dtype=np.int64),
                                 "cos_sim": pd.Series([], dtype=float)})
    partials = partials.sort_values(["query_id", "cos_sim", "vec_id"],
                                    ascending=[True, False, True], kind="mergesort")
    out = partials.groupby("query_id", sort=True).head(k).reset_index(drop=True)
    out["cos_sim"] = round_half_away(out["cos_sim"], 4)
    return out[["query_id", "vec_id", "cos_sim"]]


def label_centroids(sf_dir: str):
    """Per-label embedding centroid, long format ``(label, dim, c)`` — the
    vector AGGREGATE the ANN/IVF family builds on (k-means assignment steps,
    cluster summaries, prototype vectors for dedup blocking).

    Per-batch per-label partial sums (one C-level groupby over the stacked
    float64 matrix) → a ``(label, dim)`` groupby of partials — the shuffle
    moves |labels| × dim rows per batch, never the vectors themselves.  The
    mean is derived driver-side from exact sum/count partials (≤ |labels| ×
    dim rows at any corpus size)."""
    from ray.data.aggregate import Sum

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["embedding", "label"])

    def partial(df: pd.DataFrame) -> pa.Table:
        df = df[df["embedding"].notna()]
        m = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        lab = df["label"].to_numpy(np.int64)
        codes, uniq = pd.factorize(lab)
        sums = pd.DataFrame(m).groupby(codes, sort=False).sum()
        counts = np.bincount(codes, minlength=len(uniq)).astype(np.int64)
        L, D = sums.shape
        return pa.table({
            "label": pa.array(np.repeat(uniq[sums.index.to_numpy()], D)),
            "dim": pa.array(np.tile(np.arange(1, D + 1, dtype=np.int64), L)),
            "partial_sum": pa.array(sums.to_numpy().ravel()),
            "partial_n": pa.array(np.repeat(counts[sums.index.to_numpy()], D)),
        })

    # (label × dim)-bounded partials: streamed driver fold instead of a
    # full AllToAll fixed cost for a few hundred distinct rows
    from .relational import _merge_bounded_partials

    agg = _merge_bounded_partials(
        ds.map_batches(partial, batch_format="pandas", batch_size=4096),
        keys=["label", "dim"], sums={"partial_sum": "s", "partial_n": "n"})
    if agg is None:  # empty embeddings table: typed empty, not a crash
        return pd.DataFrame({"label": pd.Series([], dtype=object),
                             "dim": pd.Series([], dtype=np.int64),
                             "c": pd.Series([], dtype=np.float64)})
    agg["c"] = round_half_away(agg["s"].to_numpy(np.float64)
                               / agg["n"].to_numpy(np.float64), 6)
    return agg[["label", "dim", "c"]].sort_values(["label", "dim"]) \
        .reset_index(drop=True)


def label_centroids_oracle_sql() -> str:
    return """
        SELECT label, CAST(i AS BIGINT) AS dim,
               round(avg(embedding[i]), 6) AS c
        FROM embeddings, UNNEST(generate_series(1, len(embedding))) AS t(i)
        GROUP BY label, i"""


class PQCodebook:
    """Product quantizer (Jégou et al. 2011) for inner-product scoring over
    L2-NORMALIZED vectors: the dim-d vector splits into ``m_sub`` contiguous
    subspaces, each quantized to one of ``k`` per-subspace centroids trained
    by Lloyd k-means on the Dataset-native sample (:func:`_sample_embeddings`
    — deterministic under any partitioning).  A vector encodes to ``m_sub``
    uint8 codes: at dim=64/float32 that is 8 bytes vs 256 — the 32x memory
    lever that lets a 100 TB embedding corpus's index stay in the object
    store while the raw vectors stream from parquet only at (re)build time.
    approx_IP(q, x) = Σ_s LUT[s, code_s(x)] with LUT[s, c] = q_s · C[s, c]
    (asymmetric distance computation: the query stays exact)."""

    def __init__(self, sample: np.ndarray, m_sub: int = 8, k: int = 256,
                 iters: int = 10, seed: int = 42) -> None:
        dim = sample.shape[1]
        if dim % m_sub:
            raise ValueError(f"dim {dim} not divisible by m_sub {m_sub}")
        self.m_sub, self.k, self.dsub = m_sub, k, dim // m_sub
        kk = min(k, len(sample))
        self.C = np.zeros((m_sub, k, self.dsub))
        # SQL-replayable Lloyd: hash-order initial centroids (the sample is
        # hash-ordered), argmin on the |c|^2 - 2 x.c distance proxy ROUNDED
        # to 9 dp with ties to the lowest code (same proxy as encode(), so
        # the oracle replays ONE formula), means rounded to 9 dp per
        # iteration — numpy/DuckDB summation-order noise cannot cascade.
        for s in range(m_sub):
            sub = sample[:, s * self.dsub:(s + 1) * self.dsub]
            cent = sub[:kk].copy()
            for _ in range(iters):
                c2 = (cent ** 2).sum(-1)
                a = round_half_away(c2[None, :] - 2.0 * (sub @ cent.T),
                                    9).argmin(1)
                for c in range(kk):
                    members = sub[a == c]
                    if len(members):
                        cent[c] = round_half_away(members.mean(0), 9)
            self.C[s, :kk] = cent

    def encode(self, m: np.ndarray) -> np.ndarray:
        """(n, dim) float → (n, m_sub) uint8 nearest-centroid codes.

        argmin ||x − c||² = argmin (||c||² − 2 x·c): one (B, dsub) @
        (dsub, k) matmul per subspace instead of a (B, k, dsub) broadcast
        — ~10x fewer memory touches at k=256."""
        codes = np.empty((len(m), self.m_sub), np.uint8)
        for s in range(self.m_sub):
            sub = m[:, s * self.dsub:(s + 1) * self.dsub]
            c2 = (self.C[s] ** 2).sum(-1)  # (k,)
            codes[:, s] = round_half_away(
                c2[None, :] - 2.0 * (sub @ self.C[s].T), 9).argmin(1)
        return codes

    def lut(self, q: np.ndarray) -> np.ndarray:
        """(dim,) query → (m_sub, k) inner-product lookup table."""
        return np.einsum("sd,scd->sc",
                         q.reshape(self.m_sub, self.dsub), self.C)

    def score(self, luts: np.ndarray, codes: np.ndarray) -> np.ndarray:
        """(Q, m_sub, k) LUTs x (B, m_sub) codes → (Q, B) approx IP: one
        fancy-gather per subspace, no per-row Python."""
        out = np.zeros((luts.shape[0], len(codes)))
        for s in range(self.m_sub):
            out += luts[:, s, codes[:, s]]
        return out


def _exact_rerank(sf_dir: str, cand: pd.DataFrame, qids: np.ndarray,
                  qm: np.ndarray, k: int) -> pd.DataFrame:
    """Exact re-scoring of a global candidate set: ONE pruned point-lookup
    read fetches just the candidate embeddings (vec_id IN-filter pushed
    into the parquet scan — at 100 TB the non-candidate corpus never
    leaves storage), then an exact cosine top-k per query.  Shared by the
    inline and indexed PQ paths so both emit identical results for the
    same candidates."""
    import pyarrow.compute as pc
    import pyarrow.dataset as pads

    want_ids = pa.array(sorted(set(cand["vec_id"].tolist())))
    emb = pads.dataset(f"{sf_dir}/embeddings.parquet").to_table(
        columns=["vec_id", "embedding"],
        filter=pc.field("vec_id").isin(want_ids)).to_pandas()
    m = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    norms = np.linalg.norm(m, axis=1)
    norms[norms == 0] = 1.0
    m = m / norms[:, None]
    pos = {int(v): i for i, v in enumerate(emb["vec_id"].to_numpy())}
    rows = []
    for qi in range(len(qids)):
        cv = cand.loc[cand["query_id"] == qids[qi], "vec_id"] \
            .to_numpy(np.int64)
        s = m[[pos[int(v)] for v in cv]] @ qm[qi]
        rows.append(pd.DataFrame({"query_id": qids[qi], "vec_id": cv,
                                  "score": s}))
    allr = pd.concat(rows, ignore_index=True) \
        .sort_values(["query_id", "score", "vec_id"],
                     ascending=[True, False, True], kind="mergesort")
    out = allr.groupby("query_id", sort=True).head(k).reset_index(drop=True)
    out["score"] = round_half_away(out["score"], 4)
    return out[["query_id", "vec_id", "score"]]


def ann_topk_pq(sf_dir: str, n_queries: int = 10, k: int = 5,
                m_sub: int = 8, k_codes: int = 256, rerank: int = 20,
                sample_n: int = 2048):
    """ANN via product quantization: train codebooks on the Dataset-native
    sample, encode each batch to uint8 codes, score ALL queries against the
    batch with LUT gathers, keep per-batch partial top-k, tiny driver merge —
    the :func:`ann_topk` pattern with the matmul replaced by code gathers.

    ``rerank > 0``: the GLOBAL top ``max(k, rerank)`` PQ candidates per
    query (per-batch approx partials → driver merge — batch-boundary
    INVARIANT, so the result is a pure function of the data and the
    SQL oracle can replay it) are re-scored exactly via ONE pruned
    candidate read (:func:`_exact_rerank`) — the standard ADC+rerank
    recipe: PQ prunes, exact ranks, recall approaches the exact scan at a
    fraction of the flops.  Returns (query_id, vec_id, score) with
    score = approx IP (or exact cosine when reranked), rounded like
    ann_topk."""
    sample = _sample_embeddings(sf_dir, n=sample_n)
    pq_ = PQCodebook(sample, m_sub=m_sub, k=k_codes)
    qids, qm = _load_queries(sf_dir, n_queries)
    luts = np.stack([pq_.lut(q) for q in qm])  # (Q, m_sub, k)
    b_ref = ray.put((qids, luts, pq_))
    take_n = max(k, rerank) if rerank else k

    def local_topk(df: pd.DataFrame) -> pd.DataFrame:
        qids_, luts_, pq2 = ray.get(b_ref)
        ids = df["vec_id"].to_numpy(np.int64)
        m = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        norms = np.linalg.norm(m, axis=1)
        norms[norms == 0] = 1.0
        m = m / norms[:, None]
        # approx IP rounded to 9 dp: identical in the SQL replay, and ties
        # (shared codes) resolve by vec_id so the local-top + driver merge
        # is batch-boundary invariant
        sims = round_half_away(pq2.score(luts_, pq2.encode(m)), 9)  # (Q, B)
        out = []
        for qi in range(len(qids_)):
            s = sims[qi].copy()
            s[ids == qids_[qi]] = -np.inf  # exclude self
            idx = np.lexsort((ids, -s))[:min(take_n, len(ids))]
            out.append(pd.DataFrame({"query_id": qids_[qi],
                                     "vec_id": ids[idx],
                                     "score": s[idx]}))
        return pd.concat(out, ignore_index=True)

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding"])
    partials = ds.map_batches(local_topk, batch_format="pandas",
                              batch_size=4096).to_pandas()
    partials = partials.sort_values(["query_id", "score", "vec_id"],
                                    ascending=[True, False, True],
                                    kind="mergesort")
    cand = partials.groupby("query_id", sort=True).head(take_n)
    if rerank:
        return _exact_rerank(sf_dir, cand, qids, qm, k)
    out = cand.groupby("query_id", sort=True).head(k).reset_index(drop=True)
    out["score"] = round_half_away(out["score"], 4)
    return out[["query_id", "vec_id", "score"]]


def pq_build(sf_dir: str, index_dir: str, m_sub: int = 8, k_codes: int = 256,
             sample_n: int = 2048) -> PQCodebook:
    """Write-once PQ code index: codebook (npz) + a codes parquet with
    ``vec_id`` and ``m_sub`` uint8 columns — 8 bytes/vector at the default
    dim-64/m_sub-8, a 32x smaller artifact than the float32 embedding
    column.  Re-running with the index present is a no-op (marker file,
    the sink's write-once idiom)."""
    done = os.path.join(index_dir, "_DONE")
    cb_path = os.path.join(index_dir, "codebook.npz")
    if os.path.exists(done):
        z = np.load(cb_path)
        pq_ = PQCodebook.__new__(PQCodebook)
        pq_.C = z["C"]
        pq_.m_sub, pq_.k, pq_.dsub = (int(z["m_sub"]), int(z["k"]),
                                      int(z["dsub"]))
        return pq_
    os.makedirs(index_dir, exist_ok=True)
    sample = _sample_embeddings(sf_dir, n=sample_n)
    pq_ = PQCodebook(sample, m_sub=m_sub, k=k_codes)
    np.savez(cb_path, C=pq_.C, m_sub=pq_.m_sub, k=pq_.k, dsub=pq_.dsub)
    pq_ref = ray.put(pq_)

    def enc(df: pd.DataFrame) -> pd.DataFrame:
        pq2 = ray.get(pq_ref)
        m = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        norms = np.linalg.norm(m, axis=1)
        norms[norms == 0] = 1.0
        codes = pq2.encode(m / norms[:, None])
        out = {"vec_id": df["vec_id"].to_numpy(np.int64)}
        for s in range(pq2.m_sub):
            out[f"c{s}"] = codes[:, s]
        return pd.DataFrame(out)

    ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                          columns=["vec_id", "embedding"]) \
        .map_batches(enc, batch_format="pandas", batch_size=4096) \
        .write_parquet(os.path.join(index_dir, "codes"))
    with open(done, "w") as f:
        f.write("ok")
    return pq_


def ann_topk_pq_indexed(sf_dir: str, index_dir: str | None = None,
                        n_queries: int = 10, k: int = 5, m_sub: int = 8,
                        k_codes: int = 256, rerank: int = 20):
    """ANN over the PERSISTED PQ code index: the query scan reads ONLY the
    uint8 codes parquet (8 bytes/vector — the embedding column never leaves
    storage), scores with LUT gathers, merges a global candidate top —
    then ONE pruned read fetches just the ~n_queries x rerank candidate
    embeddings (vec_id IN-filter pushed into the parquet scan) for exact
    re-scoring.  This is the shape that pays at 100 TB: inline PQ
    (:func:`ann_topk_pq`) re-encodes the corpus per query set, so its
    flops EXCEED the exact matmul at small query counts; the indexed path
    amortizes encoding into the one-time build and makes every later query
    set an 8-byte-per-vector scan + a point-lookup read."""
    import tempfile

    qids, qm = _load_queries(sf_dir, n_queries)
    own_tmp = index_dir is None
    if own_tmp:
        index_dir = tempfile.mkdtemp(prefix="pwr_pq_")
    try:
        pq_ = pq_build(sf_dir, index_dir, m_sub=m_sub, k_codes=k_codes)
        luts = np.stack([pq_.lut(q) for q in qm])
        ref = ray.put((qids, luts, pq_))
        take_n = max(k, rerank)

        def code_topk(df: pd.DataFrame) -> pd.DataFrame:
            qids_, luts_, pq2 = ray.get(ref)
            ids = df["vec_id"].to_numpy(np.int64)
            codes = np.stack([df[f"c{s}"].to_numpy(np.uint8)
                              for s in range(pq2.m_sub)], axis=1)
            sims = round_half_away(pq2.score(luts_, codes), 9)
            out = []
            for qi in range(len(qids_)):
                s = sims[qi].copy()
                s[ids == qids_[qi]] = -np.inf
                idx = np.lexsort((ids, -s))[:min(take_n, len(ids))]
                out.append(pd.DataFrame({"query_id": qids_[qi],
                                         "vec_id": ids[idx],
                                         "score": s[idx]}))
            return pd.concat(out, ignore_index=True)

        partials = ray.data.read_parquet(os.path.join(index_dir, "codes")) \
            .map_batches(code_topk, batch_format="pandas", batch_size=8192) \
            .to_pandas()
        partials = partials.sort_values(["query_id", "score", "vec_id"],
                                        ascending=[True, False, True],
                                        kind="mergesort")
        cand = partials.groupby("query_id", sort=True).head(take_n)
        if not rerank:
            out = cand.groupby("query_id", sort=True).head(k) \
                .reset_index(drop=True)
            out["score"] = round_half_away(out["score"], 4)
            return out[["query_id", "vec_id", "score"]]

        # exact re-scoring: one pruned point-lookup read of the candidates
        return _exact_rerank(sf_dir, cand, qids, qm, k)
    finally:
        if own_tmp:
            import shutil

            shutil.rmtree(index_dir, ignore_errors=True)

def kmeans_embeddings(sf_dir: str, k: int = 8, iters: int = 3):
    """Distributed Lloyd k-means over the FULL embeddings table — the
    broadcast-iterate shape (vs :class:`IVFIndex`, which trains on a sample
    inside one actor): each iteration broadcasts the k×d centroid matrix
    once via ``ray.put``, every batch assigns locally (vectorized argmin,
    ties → lowest centroid id) and pre-aggregates to per-cluster partial
    sums (k rows × (d+1) floats per batch — the shuffle/driver merge is
    bounded by k × n_batches, never the corpus), and the driver folds the
    tiny partials into new centroids.

    Determinism: seeds are the k vectors with the smallest
    ``md5_u64(str(vec_id))`` (rank also by vec_id), and every new centroid
    rounds to 6 dp — so the engine's numpy sums and the oracle's SQL sums
    (which add in different orders) cannot drift across iterations.  Empty
    clusters keep their previous centroid.  Output: (vec_id, cluster)."""
    from ..functions.hashing import md5_u64

    # iterative algorithm: seed + ``iters`` assignment passes + the final
    # labeling all scan the same two columns — materialize ONCE into the
    # object store instead of re-reading/re-decoding parquet per pass
    # (embeddings is the small table; at 100 TB the spill path absorbs it)
    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding"]).materialize()

    def seed_partial(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["vec_id"].to_numpy(np.int64)
        h = md5_u64(ids.astype(str))
        o = np.lexsort((ids, h))[:k]
        return pd.DataFrame({"vec_id": ids[o],
                             "h": h[o].view(np.int64),
                             "embedding": df["embedding"].to_numpy()[o]})

    cand = ds.map_batches(seed_partial, batch_format="pandas").to_pandas()
    if not len(cand):  # empty table: typed empty frame, oracle-equivalent
        return pd.DataFrame({"vec_id": pd.Series([], dtype=np.int64),
                             "cluster": pd.Series([], dtype=np.int64)})
    cand["hu"] = cand["h"].to_numpy(np.int64).view(np.uint64)
    cand = cand.sort_values(["hu", "vec_id"]).head(k)
    C = np.stack(cand["embedding"].to_numpy()).astype(np.float64)

    def make_partial(ref):
        def partial(df: pd.DataFrame) -> pd.DataFrame:
            import ray as _ray

            cm = _ray.get(ref)
            m = np.stack(df["embedding"].to_numpy()).astype(np.float64)
            d = ((m[:, None, :] - cm[None, :, :]) ** 2).sum(-1)
            a = np.argmin(d, axis=1)
            out = {"cid": np.arange(len(cm), dtype=np.int64),
                   "n": np.bincount(a, minlength=len(cm)).astype(np.int64)}
            for j in range(m.shape[1]):
                out[f"s{j}"] = np.bincount(a, weights=m[:, j],
                                           minlength=len(cm))
            return pd.DataFrame(out)
        return partial

    from .relational import _merge_bounded_partials

    scols = [f"s{j}" for j in range(C.shape[1])]
    for _ in range(iters):
        ref = ray.put(C)
        parts = _merge_bounded_partials(
            ds.map_batches(make_partial(ref), batch_format="pandas"),
            keys=["cid"], sums={c: c for c in ["n"] + scols})
        g = parts.groupby("cid", sort=True).sum()
        n = g["n"].to_numpy(np.float64)
        sums = g[[f"s{j}" for j in range(C.shape[1])]].to_numpy(np.float64)
        with np.errstate(invalid="ignore"):
            newc = sums / n[:, None]
        newc = np.where(n[:, None] > 0, round_half_away(newc, 6), C)
        C = newc

    ref = ray.put(C)

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        import ray as _ray

        cm = _ray.get(ref)
        m = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        d = ((m[:, None, :] - cm[None, :, :]) ** 2).sum(-1)
        return pd.DataFrame({"vec_id": df["vec_id"].to_numpy(np.int64),
                             "cluster": np.argmin(d, axis=1).astype(np.int64)})

    out = ds.map_batches(assign, batch_format="pandas").to_pandas()
    return out.sort_values("vec_id").reset_index(drop=True)


def kmeans_embeddings_oracle_sql(k: int = 8, iters: int = 3) -> str:
    """SQL replay of the exact iteration chain: same md5 seeds, same
    squared-distance argmin with cid tie-break, same 6-dp centroid
    rounding, same empty-cluster carry-forward."""
    hash_expr = ("('0x' || substring(md5(CAST(vec_id AS VARCHAR)), 1, 16))"
                 "::UBIGINT")
    sql = f"""
        WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS vec
                   FROM embeddings),
        c0 AS (SELECT CAST(row_number() OVER (ORDER BY {hash_expr}, vec_id)
                           - 1 AS BIGINT) AS cid, vec
               FROM e ORDER BY {hash_expr}, vec_id LIMIT {k})"""
    prev = "c0"
    for i in range(1, iters + 1):
        sql += f""",
        a{i} AS (SELECT vec_id, vec,
                       (SELECT c.cid FROM {prev} c
                        ORDER BY list_distance(e.vec, c.vec), c.cid
                        LIMIT 1) AS cid
                FROM e),
        m{i} AS (SELECT cid, list(v ORDER BY pos) AS vec FROM (
                    SELECT cid, pos, round(avg(x), 6) AS v FROM (
                        SELECT cid, unnest(vec) AS x,
                               generate_subscripts(vec, 1) AS pos
                        FROM a{i})
                    GROUP BY cid, pos)
                GROUP BY cid),
        c{i} AS (SELECT p.cid, coalesce(m.vec, p.vec) AS vec
                FROM {prev} p LEFT JOIN m{i} m ON m.cid = p.cid)"""
        prev = f"c{i}"
    sql += f"""
        SELECT vec_id,
               (SELECT c.cid FROM {prev} c
                ORDER BY list_distance(e.vec, c.vec), c.cid
                LIMIT 1) AS cluster
        FROM e ORDER BY vec_id"""
    return sql
