"""End-to-end corpus CURATION pipeline: the composition showcase.

One Dataset chain doing what a training-data pre-processing job actually
does — quality-filter (Gopher rules, shared thresholds with
:mod:`.text`), exact-dedup the survivors (128-bit siphash winners, the
:func:`.dedup.exact_dedup` convention), and emit the surviving documents'
token counts — demonstrating that the engine's operators COMPOSE: the
quality mask, the dedup hash and the token count are all computed in ONE
batch pass over the text (the text column crosses the object store once),
and the only shuffle is the dedup-hash co-location of the already-filtered
survivors' narrow (doc_id, h1, h2, n_tokens) rows.

Oracle: the full composition replays in SQL (rules CTE → kept → group by
text, min doc_id) — grouped on the text itself where the engine groups on
the 128-bit hash (the repo-wide exact_dedup collision trade-off, noted
there).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data

from .text import (
    QUALITY_MAX_MWL,
    QUALITY_MAX_WORDS,
    QUALITY_MIN_DISTINCT_RATIO,
    QUALITY_MIN_MWL,
    QUALITY_MIN_WORDS,
    STOPWORDS,
    _token_lists,
)


def curate_corpus(sf_dir: str, num_partitions: int = 16):
    """documents → quality keep → exact-dedup winners → (doc_id, n_tokens)."""
    from ..stages.partition import add_partition_column

    stop = set(STOPWORDS)

    def stage_a(df: pd.DataFrame) -> pd.DataFrame:
        text = df["text"].fillna("")
        toks = _token_lists(text)
        n_words = toks.str.len().to_numpy(np.int64)
        exploded = toks.explode().dropna()
        lens = exploded.str.len().groupby(level=0).sum() \
            .reindex(df.index, fill_value=0).to_numpy(np.int64)
        stops = exploded.isin(stop).groupby(level=0).any() \
            .reindex(df.index, fill_value=False).to_numpy(bool)
        nd = exploded.groupby(level=0).nunique() \
            .reindex(df.index, fill_value=0).to_numpy(np.int64)
        safe_n = np.where(n_words > 0, n_words, 1)
        mwl = lens / safe_n
        dr = nd / safe_n
        keep = ((n_words >= QUALITY_MIN_WORDS) & (n_words <= QUALITY_MAX_WORDS)
                & (mwl >= QUALITY_MIN_MWL) & (mwl <= QUALITY_MAX_MWL)
                & stops & (dr >= QUALITY_MIN_DISTINCT_RATIO))
        kept_text = text[keep]
        h1 = pd.util.hash_pandas_object(kept_text, index=False).to_numpy()
        h2 = pd.util.hash_pandas_object(
            kept_text, index=False, hash_key="9c39a2b1f04d58e7").to_numpy()
        return pd.DataFrame({
            "doc_id": df["doc_id"].to_numpy(np.int64)[keep],
            "h1": h1.view(np.int64), "h2": h2.view(np.int64),
            "n_tokens": n_words[keep]})

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"]) \
        .map_batches(stage_a, batch_format="pandas")
    ds = add_partition_column(ds, key="h1", num_partitions=num_partitions)

    def winners(df: pd.DataFrame) -> pd.DataFrame:
        w = df.sort_values(["h1", "h2", "doc_id"], kind="mergesort") \
            .drop_duplicates(["h1", "h2"])
        return pd.DataFrame({"doc_id": w["doc_id"].to_numpy(np.int64),
                             "n_tokens": w["n_tokens"].to_numpy(np.int64)})

    return ds.groupby("part").map_groups(winners, batch_format="pandas")


def curate_corpus_oracle_sql(tokens_sql: str) -> str:
    return f"""
        WITH t AS (SELECT doc_id, coalesce(text, '') AS txt,
                          {tokens_sql} AS toks
                   FROM documents),
        s AS (SELECT doc_id, txt, len(toks) AS n,
                     len(list_distinct(toks)) AS nd,
                     coalesce(list_sum(list_transform(toks,
                         x -> length(x))), 0) AS lensum,
                     len(list_filter(toks,
                         x -> x IN ('the','and','of','a','to','in'))) AS stop
              FROM t),
        kept AS (SELECT doc_id, txt, n FROM s
                 WHERE n >= {QUALITY_MIN_WORDS} AND n <= {QUALITY_MAX_WORDS}
                   AND CAST(lensum AS DOUBLE) / n >= {QUALITY_MIN_MWL}
                   AND CAST(lensum AS DOUBLE) / n <= {QUALITY_MAX_MWL}
                   AND stop > 0
                   AND CAST(nd AS DOUBLE) / n >= {QUALITY_MIN_DISTINCT_RATIO})
        SELECT min(doc_id) AS doc_id, CAST(min(n) AS BIGINT) AS n_tokens
        FROM kept GROUP BY txt"""


def prepared_corpus(sf_dir: str, num_partitions: int = 16):
    """The full training-prep composition a reference user would run as
    their whole pipeline: quality filter -> exact-dedup winners
    (:func:`curate_corpus`, one text pass) INTERSECT near-dup keep-best
    survivors (MinHash clusters with the quality keep rule,
    ``dedup.dedup_keep_best``) -> (doc_id, n_tokens).

    The near-dup DROP set (cluster members minus each cluster's kept
    member) is bounded by near-dup pair membership, so it broadcasts once
    via ``ray.put`` and the curate stream filters in place -- the two
    heavy passes (quality+hash scan, MinHash banding) stay independent
    single scans of the corpus; nothing re-shuffles to compose them."""
    import ray

    from .dedup import dedup_clusters, dedup_keep_best

    clusters = dedup_clusters(sf_dir)
    kept = dedup_keep_best(sf_dir, clusters=clusters)
    drop = set(int(d) for d in clusters["doc_id"]) \
        - set(int(d) for d in kept["kept_doc_id"])
    ref = ray.put(drop)

    def not_dropped(df: pd.DataFrame) -> pd.DataFrame:
        dd = ray.get(ref)
        return df[~df["doc_id"].isin(dd)]

    return curate_corpus(sf_dir, num_partitions) \
        .map_batches(not_dropped, batch_format="pandas")
