"""Mergeable sketches (engine-added; the reference has none — SURVEY.md §2.6).

KMV (k-minimum-values) approximate-distinct: per batch, keep the k smallest
64-bit hashes of the values per group; sketches merge by union + re-truncate
(the canonical mergeable-sketch shape: partial per batch inside
``map_batches``, one tiny ``groupby`` merge — the shuffle moves k hashes per
(group, batch), never the values).  Estimate: ``(k-1) / max_kth_normalized``.

The value hash is the first 8 bytes of ``md5(str(value))`` — deliberately
reproducible in ANSI SQL (``('0x' || substring(md5(v), 1, 16))::UBIGINT``) so
the DuckDB oracle checks the estimate EXACTLY, not just within error bounds.
md5 runs only over the per-batch distinct (group, value) pairs, so its cost
is bounded by batch cardinality, not row count.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from .hashing import md5_u64
from .rounding import round_half_away

_K = 256
_U64_MAX = float(1 << 64)


def _md5_u64(values: pd.Series) -> np.ndarray:
    """First 8 bytes of md5(str(v)) as uint64 (big-endian hex prefix)."""
    return md5_u64([str(v) for v in values])


def _kmv_estimate(hashes: np.ndarray, k: int = _K) -> float:
    hashes = np.unique(hashes)
    if len(hashes) < k:
        return float(len(hashes))  # exact below k
    kth = np.partition(hashes, k - 1)[k - 1]
    return (k - 1) / (float(kth) / _U64_MAX)


def approx_distinct(ds, group_col: str, value_col: str, k: int = _K) -> pd.DataFrame:
    """Approximate count-distinct of ``value_col`` per ``group_col``.

    map_batches partial sketches → driver-side merge of the (tiny) sketch
    rows.  Returns (group, approx_distinct) with ``approx_distinct`` exact
    whenever the true cardinality is below k."""

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({group_col: t[group_col].to_pandas(),
                           value_col: t[value_col].to_pandas()})
        # distinct (group, value) first → md5 cost is per-distinct, then a
        # fully vectorized per-group k-smallest (sort + grouped head).
        df = df.drop_duplicates()
        df = pd.DataFrame({group_col: df[group_col].to_numpy(),
                           "h": _md5_u64(df[value_col])})
        df = df.drop_duplicates().sort_values([group_col, "h"], kind="mergesort")
        out = df.groupby(group_col, sort=False).head(k)
        return pa.Table.from_pandas(out, preserve_index=False)

    sketches = ds.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True).to_pandas()
    rows = []
    for g, sub in sketches.groupby(group_col, sort=True):
        est = _kmv_estimate(sub["h"].to_numpy().astype(np.uint64), k)
        rows.append((g, float(round_half_away(est, 1))))
    return pd.DataFrame(rows, columns=[group_col, "approx_distinct"])


def approx_quantiles(ds, key: str, value_col: str, qs: tuple[float, ...],
                     bins: int = 2048, suffix: str = "value") -> pd.DataFrame:
    """Approximate per-key quantiles via a FIXED-WIDTH histogram sketch —
    the declared scale path of ``relational.quantile_rollup`` for unbounded
    or continuous value domains: the shuffle moves at most ``bins`` rows per
    key regardless of the value domain's cardinality, where the exact
    value-counts rollup moves O(|distinct values|).

    One cheap min/max pre-pass fixes the bin edges — per-batch partials
    folded on the DRIVER (key-domain-bounded; a Dataset groupby here would
    AllToAll-shuffle the raw rows just to take min/max); per-batch partials
    histogram into ``bins`` buckets; ONE ``groupby(key)`` exchange both
    merges the histogram and interpolates the quantile inside its bucket
    (the partial histograms are (key × bins)-bounded per batch, so a
    separate pre-merge exchange would only re-move the same rows).  Error ≤
    one bucket width = (max−min)/bins, asserted in
    tests/test_properties.py."""

    def minmax_partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({key: t[key].to_pandas(),
                           "v": t[value_col].to_pandas()}).dropna()
        g = df.groupby(key, sort=False)["v"].agg(["min", "max"]) \
            .reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    rng = ds.map_batches(minmax_partial, batch_format="pyarrow",
                         zero_copy_batch=True).to_pandas() \
        .groupby(key, as_index=False) \
        .agg(lo=("min", "min"), hi=("max", "max"))
    import ray as _ray

    edges = _ray.put(pd.DataFrame({
        key: rng[key].to_numpy(),
        "lo": rng["lo"].to_numpy(np.float64),
        "hi": rng["hi"].to_numpy(np.float64)}).set_index(key))

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({key: t[key].to_pandas(),
                           "v": t[value_col].to_pandas()}).dropna()
        e = _ray.get(edges)
        lo = e["lo"].reindex(df[key]).to_numpy()
        hi = e["hi"].reindex(df[key]).to_numpy()
        width = np.where(hi > lo, (hi - lo) / bins, 1.0)
        # np.floor(a / b), NOT a // b: numpy floor-division is fmod-based
        # (1.0 // 0.1 == 9) while the SQL oracle computes floor(a / b)
        # (floor(1.0 / 0.1) == 10) — the replay must share the exact op order
        b = np.clip(np.floor((df["v"].to_numpy(np.float64) - lo) / width)
                    .astype(np.int64), 0, bins - 1)
        g = pd.DataFrame({key: df[key].to_numpy(), "bin": b}) \
            .groupby([key, "bin"], sort=False).size().reset_index(name="partial_n")
        return pa.Table.from_pandas(g, preserve_index=False)

    hist = ds.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True)

    def select(g: pd.DataFrame) -> pd.DataFrame:
        # per-key quantile pick runs DISTRIBUTED (map_groups) so a
        # high-cardinality key never materializes keys × bins on the driver;
        # the fold of per-batch histogram partials happens HERE (sorted
        # groupby-sum) instead of a separate pre-merge exchange
        e = _ray.get(edges)
        k_ = g[key].iloc[0]
        g = g.groupby("bin", sort=True)["partial_n"].sum() \
            .reset_index(name="n")
        lo, hi = float(e.loc[k_, "lo"]), float(e.loc[k_, "hi"])
        width = (hi - lo) / bins if hi > lo else 1.0
        cum = g["n"].cumsum().to_numpy()
        n = int(cum[-1])
        binv = g["bin"].to_numpy(np.int64)
        row = {key: [k_], "n": [n]}
        for q in qs:
            target = q * n
            i = int(np.searchsorted(cum, target))
            i = min(i, len(binv) - 1)
            prev = cum[i - 1] if i > 0 else 0
            inbin = g["n"].to_numpy()[i]
            frac = (target - prev) / inbin if inbin else 0.0
            v = lo + (binv[i] + min(max(frac, 0.0), 1.0)) * width
            row[f"q{int(round(q * 100))}_{suffix}"] = [min(v, hi)]
        return pd.DataFrame(row)

    out = hist.groupby(key).map_groups(select, batch_format="pandas") \
        .to_pandas()  # one row per key
    return out.sort_values(key).reset_index(drop=True)


APPROX_Q_BINS = 256


def events_quantiles_approx(sf_dir: str, qs: tuple[float, ...] = (0.5, 0.9)):
    """Histogram-sketch quantiles of events.value per event_type (bins =
    APPROX_Q_BINS; error ≤ one bucket width).  Deterministic, so the DuckDB
    oracle replays the identical histogram + interpolation (see
    approx_quantiles_oracle_sql)."""
    import ray.data

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_type", "value"])
    out = approx_quantiles(ds, "event_type", "value", qs,
                           bins=APPROX_Q_BINS, suffix="value")
    for q in qs:
        c = f"q{int(round(q * 100))}_value"
        out[c] = round_half_away(out[c].to_numpy(np.float64), 6)
    return out


def approx_quantiles_oracle_sql(qs: tuple[float, ...] = (0.5, 0.9),
                                bins: int = APPROX_Q_BINS) -> str:
    """SQL replay of the fixed-width histogram quantile sketch: same bin
    assignment, same cumulative pick (first bin with cum ≥ q·n), same
    linear interpolation, identical IEEE operation order."""
    picks = []
    for q in qs:
        col = f"q{int(round(q * 100))}_value"
        picks.append(f"""
            p_{col} AS (
                SELECT event_type, lo, hi, total,
                       round(least(lo + (bin + least(greatest(
                           ({q} * total - prev) / n, 0.0), 1.0)) * width, hi),
                           6) AS {col}
                FROM c
                WHERE cum >= {q} * total
                QUALIFY row_number() OVER (PARTITION BY event_type
                                           ORDER BY bin) = 1)""")
    joins = "\n            ".join(
        f"JOIN p_q{int(round(q * 100))}_value USING (event_type)"
        for q in qs)
    cols = ", ".join(f"p_q{int(round(q * 100))}_value.q{int(round(q * 100))}_value"
                     for q in qs)
    return f"""
        WITH rngs AS (
            SELECT event_type, min(value) AS lo, max(value) AS hi,
                   count(*) AS total
            FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL
            GROUP BY event_type),
        b AS (
            SELECT e.event_type,
                   CAST(least(greatest(floor((e.value - r.lo) /
                       (CASE WHEN r.hi > r.lo THEN (r.hi - r.lo) / {bins}
                             ELSE 1.0 END)), 0), {bins - 1}) AS BIGINT) AS bin
            FROM events e JOIN rngs r USING (event_type)
            WHERE e.value IS NOT NULL),
        h AS (SELECT event_type, bin, count(*) AS n FROM b GROUP BY 1, 2),
        c0 AS (
            SELECT h.event_type, h.bin, h.n, r.lo, r.hi, r.total,
                   CASE WHEN r.hi > r.lo THEN (r.hi - r.lo) / {bins}
                        ELSE 1.0 END AS width,
                   sum(h.n) OVER (PARTITION BY h.event_type ORDER BY h.bin
                                  ROWS UNBOUNDED PRECEDING) AS cum
            FROM h JOIN rngs r USING (event_type)),
        c AS (
            SELECT *, coalesce(lag(cum) OVER (PARTITION BY event_type
                                              ORDER BY bin), 0) AS prev
            FROM c0),
        {",".join(picks)}
        SELECT rngs.event_type, rngs.total AS n, {cols}
        FROM rngs
        {joins}"""


def approx_distinct_users(sf_dir: str, k: int = 64) -> pd.DataFrame:
    """Approximate distinct user_id per event_type over the events table.

    k=64 (not the library default 256) so the estimator path — not just the
    exact-below-k path — is exercised against the oracle at sf0.01, where
    true cardinalities are ~150 per group."""
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_type", "user_id"])
    return approx_distinct(ds, "event_type", "user_id", k=k)


_HH_TOTAL_KEY = "\x00__pwr_total__\x00"  # reserved; cannot clash with real items


def heavy_hitters(ds, col: str, width: int = 64) -> pd.DataFrame:
    """EXACT heavy hitters (items with frequency > n/width) with
    sketch-bounded intermediates — the Misra-Gries candidate-then-verify
    pattern:

    1. candidate pass: each batch emits only items with batch frequency
       > batch_n/width — at most ``width`` survivors per batch regardless of
       column cardinality (the Misra-Gries retention guarantee).  Pigeonhole
       gives NO false negatives: a globally heavy item (freq > n/width) must
       be batch-heavy in at least one batch, since freq = Σ freq_b ≤
       Σ n_b/width = n/width otherwise.
    2. verify pass: exact counts of the (small, broadcast) candidate set +
       the exact total, then the true threshold filter — so the OUTPUT is
       exactly the brute-force answer, while the shuffle moved O(width ×
       batches) candidate partials instead of per-item counts of an
       unbounded domain.  Same shape as the LSH candidate→verify dedups.

    Returns (item, n) for every item with n · width > total, count desc."""
    import ray

    from ..pipelines.relational import _merge_bounded_partials

    def candidates(t: pa.Table) -> pa.Table:
        s = t[col].to_pandas().dropna()
        vc = s.value_counts()
        heavy = list(vc[vc * width > len(s)].index.astype(str))
        # the sentinel row carries the batch size (candidate rows carry 0),
        # so the exact total survives the rollup even when nothing else does
        items = heavy + [_HH_TOTAL_KEY] if len(s) else []
        rows = ([0] * len(heavy) + [len(s)]) if items else []
        return pa.table({"item": pa.array(items, pa.string()),
                         "batch_rows": pa.array(rows, pa.int64())})

    # the candidate stream is O(width × batches) rows with heavy recurrence
    # (a pigeonhole survivor shows up in most batches): the streamed
    # bounded-domain driver fold collapses it with no AllToAll
    cand = _merge_bounded_partials(
        ds.map_batches(candidates, batch_format="pyarrow",
                       zero_copy_batch=True),
        keys=["item"], sums={"batch_rows": "batch_rows"})
    if cand is None:
        return pd.DataFrame({"item": pd.Series([], dtype=str),
                             "n": pd.Series([], dtype=np.int64)})
    total = int(cand.loc[cand["item"] == _HH_TOTAL_KEY, "batch_rows"].sum())
    cand_set = cand.loc[cand["item"] != _HH_TOTAL_KEY, "item"].unique()
    if not len(cand_set) or total == 0:
        return pd.DataFrame({"item": pd.Series([], dtype=str),
                             "n": pd.Series([], dtype=np.int64)})
    ref = ray.put(set(cand_set))

    def counts(t: pa.Table) -> pa.Table:
        want = ray.get(ref)
        s = t[col].to_pandas().dropna().astype(str)
        vc = s[s.isin(want)].value_counts()
        return pa.table({"item": pa.array(vc.index.astype(str)),
                         "partial_n": pa.array(vc.to_numpy(), pa.int64())})

    # verify counts are candidate-set-bounded per batch: same streamed fold
    merged = _merge_bounded_partials(
        ds.map_batches(counts, batch_format="pyarrow", zero_copy_batch=True),
        keys=["item"], sums={"partial_n": "n"})
    if merged is None:
        return pd.DataFrame({"item": pd.Series([], dtype=str),
                             "n": pd.Series([], dtype=np.int64)})
    out = merged[merged["n"] * width > total][["item", "n"]]
    return out.sort_values(["n", "item"], ascending=[False, True]) \
        .reset_index(drop=True)


def heavy_hitter_events(sf_dir: str, width: int = 8) -> pd.DataFrame:
    """Event types holding more than 1/8 of all events (non-empty at every
    sf: the 5-type distribution always has members above 12.5%)."""
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type"])
    return heavy_hitters(ds, "event_type", width=width)


def heavy_hitters_oracle_sql(col: str = "event_type", table: str = "events",
                             width: int = 8) -> str:
    """Brute-force SQL mirror — valid because candidate→verify makes the
    engine output exactly the true threshold set (integer arithmetic only)."""
    return f"""
        SELECT CAST({col} AS VARCHAR) AS item, count(*) AS n
        FROM {table} WHERE {col} IS NOT NULL
        GROUP BY {col}
        HAVING count(*) * {width} > (SELECT count(*) FROM {table}
                                     WHERE {col} IS NOT NULL)"""


def kmv_oracle_sql(group_col: str = "event_type", value_col: str = "user_id",
                   table: str = "events", k: int = _K) -> str:
    """The DuckDB mirror of :func:`approx_distinct`: same md5-prefix hash,
    same distinct-hash set, same (k-1)/normalized-kth estimate."""
    return f"""
        WITH hashed AS (
            SELECT DISTINCT {group_col},
                   ('0x' || substring(md5(CAST({value_col} AS VARCHAR)), 1, 16))::UBIGINT AS h
            FROM {table}),
        ranked AS (
            SELECT {group_col}, h,
                   row_number() OVER (PARTITION BY {group_col} ORDER BY h) AS rn,
                   count(*) OVER (PARTITION BY {group_col}) AS nd
            FROM hashed)
        SELECT {group_col},
               round(CASE WHEN nd < {k} THEN CAST(nd AS DOUBLE)
                          ELSE ({k} - 1) / (CAST(h AS DOUBLE) / 18446744073709551616.0)
                     END, 1) AS approx_distinct
        FROM ranked
        WHERE rn = least({k}, nd)"""


# -- Count-Min sketch ---------------------------------------------------------

_CMS_D = 4
_CMS_W = 256


def _cms_buckets(users: np.ndarray, j: int, w: int = _CMS_W) -> np.ndarray:
    """SQL-replayable bucket of row j: md5_u32(f"{j}:{key}") % w — md5 runs
    once per UNIQUE key per batch (callers pass deduplicated keys)."""
    from .hashing import md5_u32

    return md5_u32([f"{j}:{u}" for u in users]) % w


def cms_user_counts(sf_dir: str, d: int = _CMS_D, w: int = _CMS_W):
    """Count-Min sketch per-user event-count ESTIMATES, built distributed
    and replayed exactly by the SQL oracle (deterministic md5 bucket hashes
    — same discipline as the KMV/MinHash families).

    Build: each batch value-counts its users (md5 once per unique user) and
    emits ≤ d×w (j, bucket, c) partials → one TINY groupby (d×w keys total,
    independent of user cardinality) → the d×w count matrix broadcasts back
    (``ray.put``).  Query: the distinct-user set (pre-distinct per batch +
    one keyed dedup) probes the matrix vectorized; est = min over the d
    rows.  The sketch is the scale object: O(d·w) memory summarizes any
    number of rows, the only full-cardinality shuffle is the query-set
    derivation itself.  CMS never underestimates (est ≥ exact count —
    property-tested)."""
    import ray

    from ..stages.partition import add_partition_column

    def partial(t: pa.Table) -> pa.Table:
        vc = t["user_id"].to_pandas().dropna().astype(np.int64).value_counts()
        users, cnts = vc.index.to_numpy(np.int64), vc.to_numpy(np.int64)
        js, buckets, cs = [], [], []
        for j in range(d):
            js.append(np.full(len(users), j, np.int64))
            buckets.append(_cms_buckets(users, j, w))
            cs.append(cnts)
        return pa.table({"j": pa.array(np.concatenate(js)),
                         "bucket": pa.array(np.concatenate(buckets)),
                         "c": pa.array(np.concatenate(cs))})

    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"])

    # The merge domain is the SKETCH (d×w cells, independent of user
    # cardinality): fold the ≤ d×w-row per-block partials on the driver with
    # one scatter-add instead of paying a fixed-cost AllToAll for a
    # fixed-size result (bounded-domain pattern, see relational.py).
    cells = ev.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True).to_pandas()
    mat = np.zeros((d, w), np.int64)
    if len(cells) and "j" in cells.columns:
        np.add.at(mat, (cells["j"].to_numpy(np.int64),
                        cells["bucket"].to_numpy(np.int64)),
                  cells["c"].to_numpy(np.int64))
    mat_ref = ray.put(mat)

    def distinct_users(t: pa.Table) -> pa.Table:
        u = pd.unique(t["user_id"].to_pandas().dropna().astype(np.int64))
        return pa.table({"user_id": pa.array(u)})

    dedup = add_partition_column(
        ev.map_batches(distinct_users, batch_format="pyarrow",
                       zero_copy_batch=True),
        key="user_id", num_partitions=8)

    def estimate(df: pd.DataFrame) -> pd.DataFrame:
        m = ray.get(mat_ref)
        users = np.unique(df["user_id"].to_numpy(np.int64))
        est = np.full(len(users), np.iinfo(np.int64).max, np.int64)
        for j in range(d):
            est = np.minimum(est, m[j, _cms_buckets(users, j, w)])
        return pd.DataFrame({"user_id": users, "est_count": est})

    return dedup.groupby("part").map_groups(estimate, batch_format="pandas")


def cms_oracle_sql(d: int = _CMS_D, w: int = _CMS_W) -> str:
    return f"""
        WITH tc AS (SELECT user_id, count(*) AS c FROM events
                    WHERE user_id IS NOT NULL GROUP BY user_id),
        h AS (SELECT user_id, c, j,
                     ('0x' || substring(md5(CAST(j AS VARCHAR) || ':'
                          || CAST(user_id AS VARCHAR)), 1, 8))::BIGINT
                     % {w} AS bucket
              FROM tc, range({d}) t(j)),
        bs AS (SELECT j, bucket, sum(c) AS s FROM h GROUP BY j, bucket)
        SELECT h.user_id, CAST(min(bs.s) AS BIGINT) AS est_count
        FROM h JOIN bs USING (j, bucket) GROUP BY h.user_id"""
