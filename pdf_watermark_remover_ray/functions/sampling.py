"""Deterministic sampling / dataset splitting (training-data staples).

Both operators key off the md5-prefix hash of the stable document id — NOT
``random()`` — so they are reproducible across runs, machines and partition
layouts, and the DuckDB oracle replays them exactly.  At 100 TB this is the
only sane sampling design: a re-run (or a resumed run) must select the same
rows without coordinating state.

- :func:`sample_documents` — Bernoulli sample: keep doc iff
  ``md5_u64(str(doc_id)) % 100 < pct``.
- :func:`split_documents` — train/val/test assignment from the same hash
  (bucket < 90 → train, < 95 → val, else test by default); disjoint and
  exhaustive by construction.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data

from .hashing import md5_u64


def _hash_bucket(ids: pd.Series, mod: int = 100) -> np.ndarray:
    return (md5_u64([str(int(i)) for i in ids]) % np.uint64(mod)).astype(np.int64)


def sample_documents(sf_dir: str, pct: int = 10):
    """Deterministic ~pct% Bernoulli sample of the documents table."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])

    def keep(df: pd.DataFrame) -> pd.DataFrame:
        return df[_hash_bucket(df["doc_id"]) < pct]

    return ds.map_batches(keep, batch_format="pandas")


def split_documents(sf_dir: str, train_pct: int = 90, val_pct: int = 5):
    """Deterministic disjoint train/val/test split assignment."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id"])

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        b = _hash_bucket(df["doc_id"])
        split = np.where(b < train_pct, "train",
                         np.where(b < train_pct + val_pct, "val", "test"))
        return pd.DataFrame({"doc_id": df["doc_id"].to_numpy(),
                             "split": split})

    return ds.map_batches(assign, batch_format="pandas")


def stratified_sample_documents(sf_dir: str, per_group: int = 20):
    """Balanced sample: the ``per_group`` docs with the SMALLEST id-hash per
    (lang, source) block — deterministic rank-by-hash, so re-runs and
    resumed runs pick identical rows and the per-group quota holds exactly
    (a Bernoulli pct can't balance skewed groups).  Same grouped-top-k
    shuffle shape as topk_orders_per_customer: one hash partition by group,
    vectorized head-k per group."""
    import ray.data

    from ..stages.partition import partitioned_map

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "lang", "source"])

    def add_rank_key(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["grp"] = df["lang"].fillna("") + "|" + df["source"].fillna("")
        # full 64-bit hash (not mod-100 buckets): a total order for ranking —
        # kept UNSIGNED so the sort matches the oracle's UBIGINT ordering
        df["h"] = md5_u64([str(int(i)) for i in df["doc_id"]])
        return df[["doc_id", "grp", "h"]]

    ds = ds.map_batches(add_rank_key, batch_format="pandas")

    def topk(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["grp", "h", "doc_id"], kind="mergesort")
        out = df.groupby("grp", sort=False).head(per_group)
        return out[["doc_id", "grp"]]

    return partitioned_map(ds, topk, key="grp", num_partitions=16)


def stratified_oracle_sql(per_group: int = 20) -> str:
    return f"""
        SELECT doc_id, coalesce(lang, '') || '|' || coalesce(source, '') AS grp
        FROM documents
        QUALIFY row_number() OVER (
            PARTITION BY coalesce(lang, '') || '|' || coalesce(source, '')
            ORDER BY CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 16))::UBIGINT
                          AS HUGEINT), doc_id) <= {per_group}"""


def sample_oracle_sql(pct: int = 10) -> str:
    return f"""
        SELECT doc_id, text FROM documents
        WHERE ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 16))::UBIGINT
              % 100 < {pct}"""


def split_oracle_sql(train_pct: int = 90, val_pct: int = 5) -> str:
    return f"""
        SELECT doc_id,
               CASE WHEN b < {train_pct} THEN 'train'
                    WHEN b < {train_pct + val_pct} THEN 'val'
                    ELSE 'test' END AS split
        FROM (SELECT doc_id,
                     ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 16))::UBIGINT
                     % 100 AS b
              FROM documents)"""


def decontaminate_split(sf_dir: str, train_pct: int = 90, val_pct: int = 5,
                        num_partitions: int = 16):
    """Exact train-set decontamination: every TRAIN document flagged when its
    exact text also appears in the TEST split (the leakage check run before
    any training corpus ships).

    Same id-hash split as :func:`split_documents`; ONE content-keyed shuffle
    (hash-partition by text, the `exact_dedup` shape) co-locates all copies
    of a text, so the train-vs-test membership test is a vectorized
    ``isin`` per partition — no broadcast of the test set (it can be large)
    and no driver-side materialization."""
    import pyarrow as pa

    from ..stages.partition import partitioned_map

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        b = _hash_bucket(df["doc_id"])
        out = pd.DataFrame({"doc_id": df["doc_id"].to_numpy(),
                            "text": df["text"].fillna("").to_numpy(),
                            "is_test": b >= train_pct + val_pct,
                            "is_train": b < train_pct})
        return out[out["is_train"] | out["is_test"]]  # val rows drop here

    ds = ds.map_batches(tag, batch_format="pandas")

    def flag(df: pd.DataFrame) -> pd.DataFrame:
        test_texts = df.loc[df["is_test"].to_numpy(bool), "text"]
        train = df[df["is_train"].to_numpy(bool)]
        return pd.DataFrame({
            "doc_id": train["doc_id"].to_numpy(),
            "contaminated": train["text"].isin(set(test_texts)).to_numpy()})

    return partitioned_map(ds, flag, key="text",
                           num_partitions=num_partitions)


def ngram_decontaminate(sf_dir: str, n: int = 5, train_pct: int = 90,
                        val_pct: int = 5, num_partitions: int = 16):
    """N-GRAM overlap decontamination (the GPT-3 appendix-C discipline,
    Brown et al. 2020): a TRAIN document is contaminated when it shares ANY
    word ``n``-gram with any TEST document — catching partial/quoted
    leakage that :func:`decontaminate_split`'s exact-text check misses.

    Scale shape: explode docs to (gram, doc_id, is_test) rows with the
    vectorized shifted-concat trick (no Python loop over tokens), ONE
    content-keyed shuffle on the gram string co-locates every copy of a
    gram (no broadcast of the test gram set — at 100 TB it does not fit),
    per-partition membership is a vectorized ``isin``, and a second
    narrow groupby on int doc_id folds hit flags.  Documents with fewer
    than ``n`` tokens emit no grams and are clean by definition."""
    import pyarrow as pa

    from ..stages.partition import partitioned_map

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        b = _hash_bucket(df["doc_id"])
        out = pd.DataFrame({"doc_id": df["doc_id"].to_numpy(np.int64),
                            "text": df["text"].fillna("").to_numpy(),
                            "is_test": b >= train_pct + val_pct,
                            "is_train": b < train_pct})
        return out[out["is_train"] | out["is_test"]]

    tagged = ds.map_batches(tag, batch_format="pandas")

    def grams(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].str.split()
        cnt = toks.str.len().to_numpy(np.int64)
        doc = np.repeat(np.arange(len(df)), cnt)
        flat = np.concatenate([*toks, np.array([], dtype=object)]) \
            .astype(object)
        if len(flat) < n:
            return pd.DataFrame({"gram": pd.Series([], dtype=object),
                                 "doc_id": pd.Series([], dtype=np.int64),
                                 "is_test": pd.Series([], dtype=bool)})
        m = len(flat) - n + 1
        ok = doc[:m] == doc[n - 1:]  # window stays inside one doc
        g = flat[:m].copy()
        for i in range(1, n):
            g = g + " "
            g = g + flat[i:m + i]
        pos = doc[:m][ok]
        return pd.DataFrame({
            "gram": g[ok],
            "doc_id": df["doc_id"].to_numpy(np.int64)[pos],
            "is_test": df["is_test"].to_numpy(bool)[pos]})

    gram_rows = tagged.map_batches(grams, batch_format="pandas")

    def hit(df: pd.DataFrame) -> pd.DataFrame:
        test_g = set(df.loc[df["is_test"].to_numpy(bool), "gram"])
        tr = df[~df["is_test"].to_numpy(bool)]
        hits = tr.loc[tr["gram"].isin(test_g), "doc_id"].unique()
        return pd.DataFrame({"doc_id": hits.astype(np.int64),
                             "hit": np.ones(len(hits), np.int64)})

    hits = partitioned_map(gram_rows, hit, key="gram",
                           num_partitions=num_partitions)

    def seed(df: pd.DataFrame) -> pd.DataFrame:
        tr = df[df["is_train"].to_numpy(bool)]
        return pd.DataFrame({"doc_id": tr["doc_id"].to_numpy(np.int64),
                             "hit": np.zeros(len(tr), np.int64)})

    seeds = tagged.map_batches(seed, batch_format="pandas")

    def fold_part(df: pd.DataFrame) -> pd.DataFrame:
        # ONE vectorized groupby-max per hash partition — not one Python
        # map_groups call per doc_id (per-key call overhead dominates at
        # any real doc count; partitioning by doc_id keeps all of a doc's
        # flag rows co-located so the max is exact)
        g = df.groupby("doc_id", sort=False)["hit"].max()
        return pd.DataFrame({"doc_id": g.index.to_numpy(np.int64),
                             "contaminated": g.to_numpy(np.int64) > 0})

    return partitioned_map(seeds.union(hits), fold_part, key="doc_id",
                           num_partitions=num_partitions)


def ngram_decontaminate_oracle_sql(n: int = 5, train_pct: int = 90,
                                   val_pct: int = 5) -> str:
    return f"""
        WITH b AS (SELECT doc_id, coalesce(text, '') AS text,
                          ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 16))::UBIGINT
                          % 100 AS bkt
                   FROM documents),
        tk AS (SELECT doc_id, bkt,
                      list_filter(regexp_split_to_array(text, '\\s+'),
                                  x -> x <> '') AS l
               FROM b),
        g AS (SELECT doc_id, bkt,
                     array_to_string(list_slice(l, i, i + {n - 1}), ' ') AS gram
              FROM tk, UNNEST(generate_series(1, len(l) - {n - 1})) AS t(i)
              WHERE len(l) >= {n}),
        hits AS (SELECT DISTINCT doc_id FROM g
                 WHERE bkt < {train_pct} AND gram IN (
                     SELECT gram FROM g WHERE bkt >= {train_pct + val_pct}))
        SELECT doc_id, doc_id IN (SELECT doc_id FROM hits) AS contaminated
        FROM b WHERE bkt < {train_pct}"""


def decontaminate_oracle_sql(train_pct: int = 90, val_pct: int = 5) -> str:
    return f"""
        WITH b AS (SELECT doc_id, coalesce(text, '') AS text,
                          ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 16))::UBIGINT
                          % 100 AS bkt
                   FROM documents)
        SELECT doc_id,
               text IN (SELECT text FROM b WHERE bkt >= {train_pct + val_pct})
               AS contaminated
        FROM b WHERE bkt < {train_pct}"""


def mix_rebalanced_documents(sf_dir: str):
    """APPLY the domain-mixing weights: deterministically down-sample
    over-represented (lang, source) blocks so the kept corpus moves toward a
    uniform token mixture — the step that consumes
    ``text.source_mix_weights``'s output in a real corpus build.

    Per-block keep-rate = min(1, mix_weight); keep decision =
    ``md5_u64(doc_id) % 1e6 < rate * 1e6`` — the same id-hash discipline as
    every sampler here (reproducible across runs/partitions, SQL-replayable,
    integer threshold so there is no float-comparison edge).  The tiny
    (block → rate) table broadcasts via ``ray.put``; the documents scan
    filters per batch with two vectorized lookups."""
    import ray

    from ..pipelines.text import source_mix_weights

    mix = source_mix_weights(sf_dir)
    thr = mix[["lang", "source"]].copy()
    # a zero-token block carries mix_weight NULL/NaN; define the policy
    # explicitly as KEEP (rate 1.0 — no token evidence to downsample on).
    # The oracle states the same via coalesce(least(1.0, w), 1.0)
    thr["lim"] = ((mix["mix_weight"].clip(upper=1.0).fillna(1.0)
                   * 1_000_000).round().astype(np.int64))
    thr_ref = ray.put(thr)

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "lang", "source"])

    def keep(df: pd.DataFrame) -> pd.DataFrame:
        # vectorized merge against the tiny broadcast (block -> lim) frame;
        # mix keys are ''-coalesced, so coalesce here too before joining
        d = df.copy()
        d["lang"] = d["lang"].fillna("")
        d["source"] = d["source"].fillna("")
        m = d.merge(ray.get(thr_ref), on=["lang", "source"], how="inner")
        h = _hash_bucket(m["doc_id"], mod=1_000_000)
        return m.loc[h < m["lim"].to_numpy(np.int64),
                     ["doc_id", "lang", "source"]]

    return ds.map_batches(keep, batch_format="pandas")


def mix_rebalanced_oracle_sql() -> str:
    from ..pipelines.text import source_mix_weights_oracle_sql

    return f"""
        WITH mix AS ({source_mix_weights_oracle_sql()}),
        thr AS (SELECT lang, source,
                       CAST(round(coalesce(least(1.0, mix_weight), 1.0)
                                  * 1000000, 0)
                            AS BIGINT) AS lim
                FROM mix)
        SELECT d.doc_id, coalesce(d.lang, '') AS lang,
               coalesce(d.source, '') AS source
        FROM documents d
        JOIN thr ON coalesce(d.lang, '') = thr.lang
                AND coalesce(d.source, '') = thr.source
        WHERE ('0x' || substring(md5(CAST(d.doc_id AS VARCHAR)), 1, 16))::UBIGINT
              % 1000000 < lim"""


SHUFFLE_SEED = 42


def shuffle_documents(sf_dir: str, seed: int = SHUFFLE_SEED,
                      num_buckets: int = 16):
    """Deterministic seeded GLOBAL corpus shuffle: every document gets its
    position in the md5('seed:doc_id')-hash permutation (the pre-sharding
    shuffle of a training pipeline; seeded-hash rank, so re-runs and resumed
    runs produce the identical permutation with zero coordination).

    No global sort operator: md5 hashes are uniform, so the top hash bits
    give equal-width RANGE buckets — per-bucket counts roll up to a
    ``num_buckets``-row table, the driver exclusive-scans it, and each
    bucket enumerates locally at offset + arange.  The shuffle moves
    (doc_id, h) = 16 bytes/row; text never moves; same distributed
    prefix-sum shape as text.pack_sequences, with counts not sums."""
    shift = np.uint64(64 - int(np.log2(num_buckets)))
    if (1 << (64 - int(shift))) != num_buckets:  # survives python -O
        raise ValueError("num_buckets must be a power of 2")
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id"])

    def hashed(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].to_numpy(np.int64)
        h = md5_u64([f"{seed}:{i}" for i in ids])
        return pd.DataFrame({"doc_id": ids,
                             "h": h.view(np.int64),  # arrow-safe; same order
                             "bucket": (h >> shift).astype(np.int64)})

    hd = ds.map_batches(hashed, batch_format="pandas").materialize()

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df["bucket"].value_counts()
        return pd.DataFrame({"bucket": g.index.to_numpy(np.int64),
                             "partial_n": g.to_numpy(np.int64)})

    # bucket-domain-bounded partials: streamed driver fold instead of
    # paying a full AllToAll fixed cost for a few hundred distinct rows
    from ..pipelines.relational import _merge_bounded_partials

    per_bucket = _merge_bounded_partials(
        hd.map_batches(partial, batch_format="pandas"),
        keys=["bucket"], sums={"partial_n": "n"})
    totals = np.zeros(num_buckets + 1, np.int64)
    if per_bucket is not None:
        totals[per_bucket["bucket"].to_numpy(np.int64)] = \
            per_bucket["n"].to_numpy(np.int64)
    offsets = np.concatenate(([0], np.cumsum(totals)[:-1]))

    def enumerate_bucket(df: pd.DataFrame) -> pd.DataFrame:
        # the stored int64 is a bit-view; sort in uint64 space (the int64
        # ORDER would flip for hashes >= 2^63)
        h = df["h"].to_numpy(np.int64).view(np.uint64)
        ids = df["doc_id"].to_numpy(np.int64)
        order = np.lexsort((ids, h))
        pos = offsets[int(df["bucket"].iloc[0])] + np.arange(len(df))
        return pd.DataFrame({"doc_id": ids[order], "pos": pos})

    return hd.groupby("bucket").map_groups(enumerate_bucket,
                                           batch_format="pandas")


def shuffle_oracle_sql(seed: int = SHUFFLE_SEED) -> str:
    return f"""
        SELECT doc_id,
               row_number() OVER (ORDER BY
                   ('0x' || substring(md5('{seed}:' || CAST(doc_id AS VARCHAR)),
                                      1, 16))::UBIGINT, doc_id) - 1 AS pos
        FROM documents"""


def capped_sample_per_group(sf_dir: str, cap: int = 3,
                            num_partitions: int = 8):
    """Per-group CAPPED deterministic sample: at most ``cap`` documents per
    (lang, source) cell, chosen by md5(doc_id) order — the downsampling
    primitive for capping over-represented corpus slices without a global
    sort (every row's keep/drop decision depends only on its group's hash
    order, reproducible under any partitioning).

    Scale path: each batch pre-trims to its local per-group top-``cap`` by
    hash (so the group-hash shuffle moves ≤ cap × groups × blocks rows),
    then one co-located selection per group cell finishes the job.  Oracle:
    QUALIFY row_number() OVER hash order — exact SQL replay via the md5
    prefix convention."""
    import numpy as np
    import pandas as pd
    import ray.data

    from ..functions.hashing import md5_u64
    from ..stages.partition import add_partition_column

    def pretrim(df: pd.DataFrame) -> pd.DataFrame:
        df = pd.DataFrame({
            "doc_id": df["doc_id"].to_numpy(np.int64),
            "lang": df["lang"].fillna("").to_numpy(),
            "source": df["source"].fillna("").to_numpy()})
        df["h"] = md5_u64(df["doc_id"].astype(str))
        df = df.sort_values(["lang", "source", "h"], kind="mergesort")
        return df.groupby(["lang", "source"], sort=False).head(cap)

    def pick(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["lang", "source", "h"], kind="mergesort")
        out = df.groupby(["lang", "source"], sort=False).head(cap)
        return pd.DataFrame({"doc_id": out["doc_id"].to_numpy(np.int64),
                             "lang": out["lang"].to_numpy(),
                             "source": out["source"].to_numpy()})

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "lang", "source"]) \
        .map_batches(pretrim, batch_format="pandas")
    ds = add_partition_column(ds, key="lang", num_partitions=num_partitions)
    return ds.groupby("part").map_groups(pick, batch_format="pandas")


def capped_sample_oracle_sql(cap: int = 3) -> str:
    return f"""
        SELECT doc_id, coalesce(lang, '') AS lang,
               coalesce(source, '') AS source
        FROM documents
        QUALIFY row_number() OVER (
            PARTITION BY coalesce(lang, ''), coalesce(source, '')
            ORDER BY ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 16))::UBIGINT,
                     doc_id) <= {cap}"""

def weighted_sample_documents(sf_dir: str, k: int = 100):
    """Deterministic weighted sample WITHOUT replacement (top-``k``):
    Efraimidis–Spirakis A-ES keys ``u^(1/w)`` with ``u`` a seedless
    md5-of-id uniform and ``w = max(n_chars, 1)`` — longer documents are
    proportionally likelier, re-runs pick identical rows, and the whole
    selection is a distributed top-k (each batch emits at most ``k``
    candidate rows; the driver merges ≤ k·num_batches candidates), never a
    global sort.  The text column is never read — the weight comes from the
    ``n_chars`` metadata column.  (Efraimidis & Spirakis 2006, "Weighted
    random sampling with a reservoir" — public.)"""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "n_chars"])

    def partial_topk(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].to_numpy(np.int64)
        w = np.maximum(df["n_chars"].to_numpy(np.float64), 1.0)
        u = md5_u64(ids.astype(str)).astype(np.float64) / 2.0 ** 64
        key = u ** (1.0 / w)
        out = pd.DataFrame({"doc_id": ids, "weight": w.astype(np.int64),
                            "key": key})
        return out.sort_values(["key", "doc_id"],
                               ascending=[False, True]).head(k)

    cand = ds.map_batches(partial_topk, batch_format="pandas").to_pandas()
    if not len(cand) or "key" not in cand.columns:
        # empty table: to_pandas() can come back column-less
        return pd.DataFrame({"doc_id": pd.Series([], dtype=np.int64),
                             "weight": pd.Series([], dtype=np.int64)})
    top = cand.sort_values(["key", "doc_id"],
                           ascending=[False, True]).head(k)
    return pd.DataFrame({"doc_id": top["doc_id"].to_numpy(np.int64),
                         "weight": top["weight"].to_numpy(np.int64)}) \
        .sort_values("doc_id").reset_index(drop=True)


def weighted_sample_oracle_sql(k: int = 100) -> str:
    return f"""
        SELECT doc_id, CAST(greatest(n_chars, 1) AS BIGINT) AS weight
        FROM documents
        QUALIFY row_number() OVER (ORDER BY
            pow(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 16))::UBIGINT
                    / 18446744073709551616.0,
                1.0 / greatest(n_chars, 1)) DESC,
            doc_id) <= {k}
        ORDER BY doc_id"""
