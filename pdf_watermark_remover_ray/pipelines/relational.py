"""Relational query pipelines over the TPC-H-ish testdata tables.

These exercise the engine's general query surface (filter / project /
aggregate / join / top-k / distinct — SURVEY.md §2.3, §2.6, §2.7) the way the
reference exercises its per-record predicates and run-summary aggregations,
but at Dataset scale:

- column pruning at the read (`read_parquet(columns=...)`);
- vectorized predicates inside ``map_batches`` (never per-row ``filter(fn)``);
- partial pre-aggregation before every ``groupby`` so the shuffle moves
  partials, not rows;
- broadcast joins for small dimension tables (``ray.put`` once, lookup per
  batch), ``Dataset.join`` hash shuffle only for large⋈large.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data
from ray.data.aggregate import Count, Max, Mean, Min, Sum

from ..stages.partition import add_partition_column, partitioned_map

from ..functions.rounding import round_half_away


def _read(sf_dir: str, table: str, columns: list[str]):
    return ray.data.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _read_small_pd(sf_dir: str, table: str, columns: list[str]) -> pd.DataFrame:
    """Driver-side read of a BROADCAST-SIDE table.  A zero-row Ray read
    yields a column-less frame (zero blocks carry no schema), so fall back
    to the parquet schema itself to keep downstream column refs safe."""
    df = _read(sf_dir, table, columns).to_pandas()
    if len(df) == 0 and not all(c in df.columns for c in columns):
        import pyarrow.parquet as _pq
        t = _pq.read_table(f"{sf_dir}/{table}.parquet", columns=columns)
        df = t.to_pandas()
    return df


def _dim_rows(sf_dir: str, table: str) -> int:
    """Parquet-METADATA row count of a dimension table — the broadcast-size
    guard reads footers only (no scan, no Ray work), so checking it before a
    driver-side ``to_pandas`` broadcast is free even at 100 TB."""
    import pyarrow.parquet as _pqm
    return _pqm.read_metadata(f"{sf_dir}/{table}.parquet").num_rows


def _merge_bounded_partials(partials, keys: list[str],
                            sums: dict[str, str],
                            how: str = "sum") -> pd.DataFrame | None:
    """Driver-side merge of per-batch partial aggregates whose GROUP DOMAIN
    is fixed by the schema — flag/status/priority/nation/year combinations,
    O(10-100) groups at ANY scale factor — so a distributed groupby would be
    pure AllToAll fixed cost (~2-5 s at sf0.1 regardless of input; see q13 /
    trade-graph notes in BASELINE.md).  The fold STREAMS ``iter_batches``
    and re-collapses the accumulator as it grows, so driver memory stays
    O(domain + one block) even at 100-TB block counts — the partials stream
    is O(domain × blocks) rows, never held at once.  NOT for key domains
    that grow with the data (customers, orders, documents) — those keep the
    distributed aggregate.  Returns None for an all-empty input
    (schema-less frame)."""
    agg_spec = {c: how for c in sums}  # any fold-associative pandas agg
    #                                    ("sum", "max", "min") — the
    #                                    re-collapse applies it to its own
    #                                    outputs, so it must be idempotent
    #                                    under regrouping
    acc: list[pd.DataFrame] = []
    pending = 0
    for b in partials.iter_batches(batch_format="pandas"):
        if not len(b.columns) or not len(b):
            continue
        acc.append(b)
        pending += len(b)
        if pending >= 65536:
            acc = [pd.concat(acc, ignore_index=True)
                   .groupby(keys, sort=False, as_index=False).agg(agg_spec)]
            pending = len(acc[0])
    if not acc:
        return None
    out = pd.concat(acc, ignore_index=True) \
        .groupby(keys, sort=False, as_index=False).agg(agg_spec)
    return out.rename(columns=sums)


def _shuffle_semijoin(fact, key_col: str, payload: list[tuple[str, pa.DataType]],
                      dim, dim_key: str, num_partitions: int = 16):
    """Hash-shuffle SEMIJOIN fallback for an over-threshold dimension
    broadcast: keep fact rows whose ``key_col`` appears in ``dim``'s
    ``dim_key`` column, emitting only the ``payload`` columns.

    Expressed as tag-union-partition (both sides union into one stream,
    ONE hash partition by key, per-partition vectorized membership) rather
    than a second ``Dataset.join`` — two hash-shuffle joins in one plan
    spawn 2×num_partitions aggregator actors and starve each other on small
    CPU counts, while this path shares the groupby machinery the rest of
    the engine uses.  Requires ``dim_key`` unique in ``dim`` (dimension
    primary keys are), so each fact row emits at most once."""
    def unify_fact(t: pa.Table) -> pa.Table:
        cols = {"__key": t[key_col].cast(pa.int64()),
                "__side": pa.array(np.zeros(len(t), np.int8))}
        for c, dt in payload:
            cols[c] = t[c]
        return pa.table(cols)

    def unify_dim(t: pa.Table) -> pa.Table:
        n = len(t)
        cols = {"__key": t[dim_key].cast(pa.int64()),
                "__side": pa.array(np.ones(n, np.int8))}
        for c, dt in payload:
            cols[c] = pa.nulls(n, dt)
        return pa.table(cols)

    u = fact.map_batches(unify_fact, batch_format="pyarrow",
                         zero_copy_batch=True) \
        .union(dim.map_batches(unify_dim, batch_format="pyarrow",
                               zero_copy_batch=True))
    u = add_partition_column(u, key="__key", num_partitions=num_partitions)
    names = [c for c, _ in payload]

    def semi(df: pd.DataFrame) -> pd.DataFrame:
        keys = df.loc[df["__side"] == 1, "__key"].unique()
        f = df[(df["__side"] == 0) & df["__key"].isin(keys)]
        f = f[names].reset_index(drop=True)
        # the dim side's nulls made pandas widen int payload columns to
        # float64 — fact rows are all non-null, so restore the declared type
        for c, dt in payload:
            if pa.types.is_integer(dt):
                f[c] = f[c].to_numpy(np.int64)
        return f

    return u.groupby("part").map_groups(semi, batch_format="pandas")


def _shuffle_attach(fact, key_col: str, payload: list[tuple[str, pa.DataType]],
                    dim, dim_key: str, dim_val: str, out_col: str,
                    val_type: pa.DataType = pa.string(), how: str = "inner",
                    default=None, num_partitions: int = 16):
    """Hash-shuffle LOOKUP-ATTACH fallback for an over-threshold dimension
    broadcast: inner- (or left-) join one dimension attribute onto a fact
    stream via the same tag-union-partition shape as
    :func:`_shuffle_semijoin`.  ``how="left"`` keeps dimension misses and
    fills ``out_col`` with ``default`` (q8's is-target flag).  ``dim_key``
    must be unique in ``dim``."""
    def unify_fact(t: pa.Table) -> pa.Table:
        cols = {"__key": t[key_col].cast(pa.int64()),
                "__side": pa.array(np.zeros(len(t), np.int8)),
                out_col: pa.nulls(len(t), val_type)}
        for c, dt in payload:
            cols[c] = t[c]
        return pa.table(cols)

    def unify_dim(t: pa.Table) -> pa.Table:
        n = len(t)
        cols = {"__key": t[dim_key].cast(pa.int64()),
                "__side": pa.array(np.ones(n, np.int8)),
                out_col: t[dim_val].cast(val_type)}
        for c, dt in payload:
            cols[c] = pa.nulls(n, dt)
        return pa.table(cols)

    u = fact.map_batches(unify_fact, batch_format="pyarrow",
                         zero_copy_batch=True) \
        .union(dim.map_batches(unify_dim, batch_format="pyarrow",
                               zero_copy_batch=True))
    u = add_partition_column(u, key="__key", num_partitions=num_partitions)
    names = [c for c, _ in payload]

    def attach(df: pd.DataFrame) -> pd.DataFrame:
        d = df[df["__side"] == 1][["__key", out_col]] \
            .rename(columns={out_col: "__val"})
        f = df[df["__side"] == 0].drop(columns=[out_col])
        m = f.merge(d, on="__key", how=("left" if how == "left" else "inner"))
        if how == "left" and default is not None:
            m["__val"] = m["__val"].fillna(default)
        m = m.rename(columns={"__val": out_col})
        m = m[names + [out_col]].reset_index(drop=True)
        # restore int payload dtypes widened to float64 by dim-side nulls
        for c, dt in payload:
            if pa.types.is_integer(dt):
                m[c] = m[c].to_numpy(np.int64)
        return m

    return u.groupby("part").map_groups(attach, batch_format="pandas")


def q1_pricing_summary(sf_dir: str, cutoff: str = "1995-09-01"):
    """TPC-H Q1-style pricing summary over lineitem."""
    ds = _read(sf_dir, "lineitem",
               ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
                "l_discount", "l_tax", "l_shipdate"])

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less_equal(t["l_shipdate"], pa.scalar(pd.Timestamp(cutoff))))
        df = t.to_pandas()
        disc = df["l_extendedprice"] * (1 - df["l_discount"])
        df["disc_price"] = disc
        df["charge"] = disc * (1 + df["l_tax"])
        g = df.groupby(["l_returnflag", "l_linestatus"], sort=False).agg(
            sum_qty=("l_quantity", "sum"),
            sum_base_price=("l_extendedprice", "sum"),
            sum_disc_price=("disc_price", "sum"),
            sum_charge=("charge", "sum"),
            count_order=("l_quantity", "size"),
        ).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    # flag×status domain is 6 groups at any SF: bounded-domain driver merge
    out = _merge_bounded_partials(
        partials, ["l_returnflag", "l_linestatus"],
        {c: c for c in ("sum_qty", "sum_base_price", "sum_disc_price",
                        "sum_charge", "count_order")})
    if out is None:
        out = pd.DataFrame({c: pd.Series([], dtype=float) for c in
                            ("sum_qty", "sum_base_price", "sum_disc_price",
                             "sum_charge")} |
                           {"l_returnflag": pd.Series([], dtype=str),
                            "l_linestatus": pd.Series([], dtype=str),
                            "count_order": pd.Series([], dtype=np.int64)})
    # avgs derived from exact sums/counts (deterministic vs the SQL oracle)
    out["avg_qty"] = round_half_away(out["sum_qty"] / out["count_order"], 4)
    out["avg_price"] = round_half_away(out["sum_base_price"] / out["count_order"], 4)
    for c in ("sum_qty", "sum_base_price", "sum_disc_price", "sum_charge"):
        out[c] = round_half_away(out[c], 2)
    return out.sort_values(["l_returnflag", "l_linestatus"]).reset_index(drop=True)


def q3_top_orders(sf_dir: str, segment: str = "BUILDING", k: int = 10,
                  broadcast_threshold: int = 5_000_000):
    """Revenue top-k open orders for one market segment (TPC-H Q3 shape).

    customer is the small side → broadcast key set; orders⋈lineitem is
    large⋈large → ``Dataset.join`` hash shuffle.

    The segment key set is ~1/5 of all customers — at extreme scale the
    broadcast itself becomes multi-GB, so above ``broadcast_threshold`` keys
    the semijoin falls back to a ``Dataset.join`` hash shuffle instead of a
    per-batch ``np.isin`` against a broadcast array.  Both paths produce the
    identical filtered orders stream (oracle-tested either side of the
    threshold)."""
    # segment predicate pushed INTO the customer scan (row-group pruning at
    # the read)
    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey"],
        filter=pc.equal(pc.field("c_mktsegment"), segment))
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])
    # guard on the UNFILTERED customer row count — a parquet-metadata read,
    # no scan (the filtered segment set can only be smaller, so the guard is
    # conservative); counting the filtered set would cost a full execution
    n_customers = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey"]).count()
    if n_customers <= broadcast_threshold:
        # the tiny key set broadcasts once
        keys_ref = ray.put(cust.to_pandas()["c_custkey"].to_numpy(np.int64))

        def filter_orders(t: pa.Table) -> pa.Table:
            keys = ray.get(keys_ref)
            mask = np.isin(t["o_custkey"].to_numpy(zero_copy_only=False), keys)
            return t.filter(pa.array(mask)).select(["o_orderkey", "o_orderdate"])

        orders = orders.map_batches(filter_orders, batch_format="pyarrow",
                                    zero_copy_batch=True)
    else:
        # big key set: hash-shuffle semijoin (shared tag-union-partition
        # fallback — see _shuffle_semijoin for why not a second
        # Dataset.join).  c_custkey is unique, so each order emits once.
        orders = _shuffle_semijoin(
            orders, "o_custkey",
            [("o_orderkey", pa.int64()), ("o_orderdate", pa.timestamp("us"))],
            cust, "c_custkey")

    def li_partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df["revenue"] = df["l_extendedprice"] * (1 - df["l_discount"])
        g = df.groupby("l_orderkey", sort=False)["revenue"].sum().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"]) \
        .map_batches(li_partial, batch_format="pyarrow", zero_copy_batch=True)

    # ONE hash shuffle: the per-batch revenue partials join the filtered
    # orders directly (the inner join also prunes to the segment's orders);
    # per-order sums complete in a small keyed aggregate over the ~|orders
    # in segment| joined partials — no second full-lineitem shuffle.
    joined = li.join(orders, join_type="inner", num_partitions=16,
                     on=("l_orderkey",), right_on=("o_orderkey",))
    joined = add_partition_column(joined, key="l_orderkey", num_partitions=16)

    # Top-k WITHOUT a global sort: each partition completes its orders' sums
    # and emits its local top-k (on the ROUNDED revenue — the oracle orders
    # by the rounded alias); the driver merges ≤ k×partitions rows.
    def agg_topk(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["l_orderkey", "o_orderdate"], sort=False, as_index=False) \
            ["revenue"].sum()
        g["revenue"] = round_half_away(g["revenue"].to_numpy(), 2)
        g = g.sort_values(["revenue", "l_orderkey"], ascending=[False, True],
                          kind="mergesort")
        return g.head(k)

    partials = joined.groupby("part").map_groups(agg_topk, batch_format="pandas") \
        .to_pandas()
    out = partials.sort_values(["revenue", "l_orderkey"], ascending=[False, True],
                               kind="mergesort").head(k).reset_index(drop=True)
    out = out.rename(columns={"l_orderkey": "o_orderkey"})
    return out[["o_orderkey", "o_orderdate", "revenue"]]


def q5_revenue_by_nation(sf_dir: str, broadcast_threshold: int = 5_000_000,
                         num_partitions: int = 16):
    """Revenue per supplier nation (TPC-H Q5 shape).

    nation (25 rows, fixed) always broadcasts.  supplier grows linearly
    with SF, so its broadcast is SIZE-GUARDED on the parquet-metadata row
    count: under ``broadcast_threshold`` the suppkey→nation map ships once
    via ``ray.put`` and each lineitem batch probes it with a vectorized
    searchsorted; above it, lineitem pre-aggregates revenue per suppkey
    per batch (the shuffle then carries ≤|suppliers| partial rows per
    batch, never raw lineitem) and the nation name attaches through the
    shared tag-union hash-shuffle lookup (:func:`_shuffle_attach`).  Both
    paths feed the same |nations|-row final aggregate (oracle-tested
    either side of the threshold)."""
    nat = _read_small_pd(sf_dir, "nation", ["n_nationkey", "n_name"])
    empty_q5 = pd.DataFrame({"n_name": pd.Series([], dtype=str),
                             "revenue": pd.Series([], dtype=float)})
    li = _read(sf_dir, "lineitem", ["l_suppkey", "l_extendedprice", "l_discount"])

    if _dim_rows(sf_dir, "supplier") <= broadcast_threshold:
        sup = _read_small_pd(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
        sup_nation = sup.merge(nat, left_on="s_nationkey",
                               right_on="n_nationkey").sort_values("s_suppkey")
        # broadcast SORTED parallel arrays: the per-batch lookup is a
        # vectorized searchsorted (no per-row dict .map over the scan)
        lookup_ref = ray.put((sup_nation["s_suppkey"].to_numpy(np.int64),
                              sup_nation["n_name"].to_numpy()))

        def partial(t: pa.Table) -> pa.Table:
            keys, names = ray.get(lookup_ref)
            df = t.to_pandas()
            if len(keys) == 0:
                return pa.table({"n_name": pa.array([], pa.string()),
                                 "revenue": pa.array([], pa.float64())})
            sk = df["l_suppkey"].to_numpy(np.int64)
            pos = np.searchsorted(keys, sk).clip(max=len(keys) - 1)
            hit = keys[pos] == sk  # inner-join semantics: unknown keys drop
            df = df[hit]
            df["n_name"] = names[pos[hit]]
            df["revenue"] = df["l_extendedprice"] * (1 - df["l_discount"])
            g = df.groupby("n_name", sort=False)["revenue"].sum().reset_index()
            return pa.Table.from_pandas(g, preserve_index=False)

        agg = li.map_batches(partial, batch_format="pyarrow",
                             zero_copy_batch=True)
    else:
        # over-threshold supplier: per-batch pre-aggregation by suppkey,
        # then ONE hash shuffle co-locating partials with the distributed
        # suppkey→nation dimension
        nat_sorted = nat.sort_values("n_nationkey")
        nk = nat_sorted["n_nationkey"].to_numpy(np.int64)
        nn = nat_sorted["n_name"].to_numpy()

        def sup_side(t: pa.Table) -> pa.Table:
            if len(nk) == 0:
                return pa.table({"s_suppkey": pa.array([], pa.int64()),
                                 "n_name": pa.array([], pa.string())})
            snk = t["s_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
            pos = np.searchsorted(nk, snk).clip(max=len(nk) - 1)
            hit = nk[pos] == snk
            return pa.table({
                "s_suppkey": t["s_suppkey"].filter(pa.array(hit)),
                "n_name": pa.array(nn[pos[hit]].astype(str))})

        sup_ds = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]) \
            .map_batches(sup_side, batch_format="pyarrow", zero_copy_batch=True)

        def li_partial(t: pa.Table) -> pa.Table:
            df = t.to_pandas()
            df["revenue"] = df["l_extendedprice"] * (1 - df["l_discount"])
            g = df.groupby("l_suppkey", sort=False)["revenue"].sum().reset_index()
            return pa.table({"l_suppkey": pa.array(g["l_suppkey"].to_numpy(np.int64)),
                             "revenue": pa.array(g["revenue"].to_numpy(np.float64))})

        li_p = li.map_batches(li_partial, batch_format="pyarrow",
                              zero_copy_batch=True)
        agg = _shuffle_attach(li_p, "l_suppkey", [("revenue", pa.float64())],
                              sup_ds, "s_suppkey", "n_name", "n_name",
                              num_partitions=num_partitions)

    # |nations|-bounded final: streamed driver fold, no AllToAll (the
    # missed sibling of the q1/q4/q7/q8 session-7 conversions)
    out = _merge_bounded_partials(agg, keys=["n_name"],
                                  sums={"revenue": "revenue"})
    if out is None:
        return empty_q5
    out["revenue"] = round_half_away(out["revenue"], 2)
    return out.sort_values("n_name").reset_index(drop=True)


def q7_volume_shipping(sf_dir: str,
                       date_lo: str = "1995-01-01", date_hi: str = "1996-12-31",
                       broadcast_threshold: int = 5_000_000,
                       num_partitions: int = 16):
    """Bilateral shipping volume (TPC-H Q7 shape): revenue between two
    nations by (supplier nation, customer nation, ship year).  The nation
    pair is DERIVED deterministically — the two smallest ``n_nationkey``
    with at least one supplier AND one customer — so the query is
    meaningful at every scale factor (a fixed pair can be supplier-empty at
    tiny sf); the oracle derives the identical pair in SQL.  The derivation
    itself is a DISTRIBUTED distinct (per-batch np.unique partials, a
    |nations|-bounded merge on the driver) — neither table is read to the
    driver for it.

    Topology: both nation maps are COMPUTED dimensions (supplier→nation and
    customer→nation, each pre-filtered to the two nations of interest).
    Each is SIZE-GUARDED on the parquet-metadata row count: under
    ``broadcast_threshold`` it ships once via ``ray.put`` and is probed
    with a vectorized searchsorted per batch; above it the name attaches
    through the shared tag-union hash-shuffle lookup
    (:func:`_shuffle_attach`) — the lineitem side attaches AFTER the
    shipdate filter so the shuffle carries the date sliver, not the full
    scan.  Either way lineitem pre-filters before the single large hash
    join against the (customer-nation-filtered) orders stream, and the
    final aggregate is a per-batch partial → 2×2×|years| groupby
    (oracle-tested on both sides of the threshold)."""
    nat = _read_small_pd(sf_dir, "nation", ["n_nationkey", "n_name"])

    def _distinct_nk(table: str, col: str) -> np.ndarray:
        def part(t: pa.Table) -> pa.Table:
            v = np.unique(t[col].to_numpy(zero_copy_only=False)
                          .astype(np.int64))
            return pa.table({"nk": pa.array(v)})

        got = _read(sf_dir, table, [col]) \
            .map_batches(part, batch_format="pyarrow", zero_copy_batch=True) \
            .to_pandas()
        if not len(got) or "nk" not in got.columns:
            return np.array([], dtype=np.int64)
        return np.unique(got["nk"].to_numpy(np.int64))

    both = nat[nat["n_nationkey"].isin(_distinct_nk("supplier", "s_nationkey"))
               & nat["n_nationkey"].isin(_distinct_nk("customer",
                                                      "c_nationkey"))]
    nations = both.sort_values("n_nationkey").head(2)
    nk2 = np.sort(nations["n_nationkey"].to_numpy(np.int64))
    nn2 = nations.sort_values("n_nationkey")["n_name"].to_numpy()

    def _dim_map_ds(table: str, key_col: str, nk_col: str):
        """Distributed (key → n_name) dimension, pre-filtered to the pair."""
        def side(t: pa.Table) -> pa.Table:
            if len(nk2) == 0:
                return pa.table({key_col: pa.array([], pa.int64()),
                                 "n_name": pa.array([], pa.string())})
            v = t[nk_col].to_numpy(zero_copy_only=False).astype(np.int64)
            pos = np.searchsorted(nk2, v).clip(max=len(nk2) - 1)
            hit = nk2[pos] == v
            return pa.table({key_col: t[key_col].filter(pa.array(hit)),
                             "n_name": pa.array(nn2[pos[hit]].astype(str))})

        return _read(sf_dir, table, [key_col, nk_col]) \
            .map_batches(side, batch_format="pyarrow", zero_copy_batch=True)

    def _probe_ref(table: str, key_col: str, nk_col: str):
        d = _read_small_pd(sf_dir, table, [key_col, nk_col]) \
            .merge(nations, left_on=nk_col, right_on="n_nationkey") \
            .sort_values(key_col)
        return ray.put((d[key_col].to_numpy(np.int64), d["n_name"].to_numpy()))

    def probe(ref, keys_np):
        keys, names = ray.get(ref)
        if len(keys) == 0:
            return (np.zeros(len(keys_np), dtype=bool),
                    np.empty(len(keys_np), object))
        pos = np.searchsorted(keys, keys_np).clip(max=len(keys) - 1)
        hit = keys[pos] == keys_np
        return hit, names[pos]

    orders_raw = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    if _dim_rows(sf_dir, "customer") <= broadcast_threshold:
        cust_ref = _probe_ref("customer", "c_custkey", "c_nationkey")

        def orders_side(t: pa.Table) -> pa.Table:
            df = t.to_pandas()
            hit, names = probe(cust_ref, df["o_custkey"].to_numpy(np.int64))
            df = df[hit]
            return pa.table(
                {"o_orderkey": pa.array(df["o_orderkey"].to_numpy(np.int64)),
                 "cust_nation": pa.array(names[hit].astype(str))})

        orders = orders_raw.map_batches(orders_side, batch_format="pyarrow",
                                        zero_copy_batch=True)
    else:
        orders = _shuffle_attach(
            orders_raw, "o_custkey", [("o_orderkey", pa.int64())],
            _dim_map_ds("customer", "c_custkey", "c_nationkey"),
            "c_custkey", "n_name", "cust_nation",
            num_partitions=num_partitions)

    lo, hi = pd.Timestamp(date_lo), pd.Timestamp(date_hi)
    li_raw = _read(sf_dir, "lineitem",
                   ["l_orderkey", "l_suppkey", "l_shipdate",
                    "l_extendedprice", "l_discount"])
    if _dim_rows(sf_dir, "supplier") <= broadcast_threshold:
        sup_ref = _probe_ref("supplier", "s_suppkey", "s_nationkey")

        def li_side(t: pa.Table) -> pa.Table:
            t = t.filter(pc.and_(
                pc.greater_equal(t["l_shipdate"], pa.scalar(lo)),
                pc.less_equal(t["l_shipdate"], pa.scalar(hi))))
            df = t.to_pandas()
            hit, names = probe(sup_ref, df["l_suppkey"].to_numpy(np.int64))
            df = df[hit]
            year = df["l_shipdate"].dt.year.to_numpy(np.int64)
            rev = (df["l_extendedprice"] * (1 - df["l_discount"])).to_numpy()
            return pa.table(
                {"l_orderkey": pa.array(df["l_orderkey"].to_numpy(np.int64)),
                 "supp_nation": pa.array(names[hit].astype(str)),
                 "l_year": pa.array(year),
                 "revenue": pa.array(rev)})

        li = li_raw.map_batches(li_side, batch_format="pyarrow",
                                zero_copy_batch=True)
    else:
        def li_pre(t: pa.Table) -> pa.Table:
            t = t.filter(pc.and_(
                pc.greater_equal(t["l_shipdate"], pa.scalar(lo)),
                pc.less_equal(t["l_shipdate"], pa.scalar(hi))))
            df = t.to_pandas()
            rev = (df["l_extendedprice"] * (1 - df["l_discount"])).to_numpy()
            return pa.table(
                {"l_orderkey": pa.array(df["l_orderkey"].to_numpy(np.int64)),
                 "l_suppkey": pa.array(df["l_suppkey"].to_numpy(np.int64)),
                 "l_year": pa.array(df["l_shipdate"].dt.year
                                    .to_numpy(np.int64)),
                 "revenue": pa.array(rev)})

        li = _shuffle_attach(
            li_raw.map_batches(li_pre, batch_format="pyarrow",
                               zero_copy_batch=True),
            "l_suppkey",
            [("l_orderkey", pa.int64()), ("l_year", pa.int64()),
             ("revenue", pa.float64())],
            _dim_map_ds("supplier", "s_suppkey", "s_nationkey"),
            "s_suppkey", "n_name", "supp_nation",
            num_partitions=num_partitions)

    joined = li.join(orders, join_type="inner", num_partitions=num_partitions,
                     on=("l_orderkey",), right_on=("o_orderkey",))

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df = df[df["supp_nation"] != df["cust_nation"]]  # cross pairs only
        g = df.groupby(["supp_nation", "cust_nation", "l_year"], sort=False) \
            ["revenue"].sum().reset_index(name="partial_rev")
        return pa.Table.from_pandas(g, preserve_index=False)

    # nation-pair × year domain is ≤ 2×2×|years|: bounded-domain driver merge
    out = _merge_bounded_partials(
        joined.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True),
        ["supp_nation", "cust_nation", "l_year"], {"partial_rev": "revenue"})
    if out is None:  # all-empty partials drop the schema
        return pd.DataFrame({"supp_nation": pd.Series([], dtype=str),
                             "cust_nation": pd.Series([], dtype=str),
                             "l_year": pd.Series([], dtype=np.int64),
                             "revenue": pd.Series([], dtype=float)})
    out["revenue"] = round_half_away(out["revenue"], 2)
    return out.sort_values(["supp_nation", "cust_nation", "l_year"]) \
        .reset_index(drop=True)


def q7_volume_shipping_oracle_sql() -> str:
    return """
        WITH pick AS (
            SELECT n_nationkey, n_name FROM nation
            WHERE n_nationkey IN (SELECT DISTINCT s_nationkey FROM supplier)
              AND n_nationkey IN (SELECT DISTINCT c_nationkey FROM customer)
            ORDER BY n_nationkey LIMIT 2)
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(year(l_shipdate) AS BIGINT) AS l_year,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN orders ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN pick n1 ON n1.n_nationkey = s_nationkey
        JOIN pick n2 ON n2.n_nationkey = c_nationkey
        WHERE n1.n_name <> n2.n_name
          AND l_shipdate BETWEEN DATE '1995-01-01' AND DATE '1996-12-31'
        GROUP BY n1.n_name, n2.n_name, year(l_shipdate)"""


def topk_orders_per_customer(sf_dir: str, k: int = 2):
    """Per-customer top-k orders by totalprice — the grouped top-k pattern:
    hash-partition on the key, vectorized per-partition head-k (no per-key
    Python).  Ties: higher o_orderkey wins (matches oracle ORDER BY)."""
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])
    ds = add_partition_column(ds, key="o_custkey", num_partitions=16)

    def topk(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["o_custkey", "o_totalprice", "o_orderkey"],
                            ascending=[True, False, False], kind="mergesort")
        out = df.groupby("o_custkey", sort=False).head(k)
        return out[["o_custkey", "o_orderkey", "o_totalprice"]]

    return ds.groupby("part").map_groups(topk, batch_format="pandas")


def orders_global_rank(sf_dir: str, num_buckets: int = 16):
    """GLOBAL ``ORDER BY (o_orderdate, o_orderkey)`` + ``ROW_NUMBER`` —
    total-order output WITHOUT a global sort operator: the scale path for
    "give every row its ordinal in a defined order" at 10^12 rows.

    Distributed prefix-count shape (same as the seeded global shuffle, but
    over a VALUE order instead of a hash order): (1) the per-date counts
    roll up distributed (shuffle = distinct dates, domain-bounded); (2) the
    driver picks ``num_buckets−1`` cut dates from the cumulative counts —
    every row of one date lands in ONE bucket, so bucket order ⊕ local
    order is the exact global order; (3) per-bucket counts exclusive-scan
    into offsets (B driver rows) and each bucket locally sorts + enumerates
    at ``offset + arange``.  Date ties can skew one bucket by one date's
    row count — bounded by the heaviest single key, the usual range-
    partition caveat (documented, LOGGED nowhere since no rows drop)."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "orders", ["o_orderkey", "o_orderdate"])

    def to_us(t: pa.Table) -> pa.Table:
        return pa.table({
            "o_orderkey": t["o_orderkey"].cast(pa.int64()),
            "d_us": t["o_orderdate"].cast(pa.timestamp("us")).cast(pa.int64()),
        })

    base = ds.map_batches(to_us, batch_format="pyarrow", zero_copy_batch=True) \
        .materialize()

    def date_partial(df: pd.DataFrame) -> pd.DataFrame:
        vc = df["d_us"].value_counts()
        return pd.DataFrame({"d_us": vc.index.to_numpy(np.int64),
                             "partial_n": vc.to_numpy(np.int64)})

    # the date domain is calendar-bounded (a few thousand distinct days at
    # any scale factor): streamed driver fold, no AllToAll
    dates = _merge_bounded_partials(
        base.map_batches(date_partial, batch_format="pandas"),
        keys=["d_us"], sums={"partial_n": "n"})
    if dates is None:
        return pd.DataFrame({"o_orderkey": pd.Series([], dtype=np.int64),
                             "rn": pd.Series([], dtype=np.int64)})
    dates = dates.sort_values("d_us")
    cum = dates["n"].to_numpy(np.int64).cumsum()
    total = int(cum[-1])
    # cut dates at the count quantiles: bucket b covers rows (b/B, (b+1)/B]
    targets = (np.arange(1, num_buckets) * total) // num_buckets
    cut_idx = np.searchsorted(cum, targets, side="left")
    cuts = np.unique(dates["d_us"].to_numpy(np.int64)[cut_idx])
    # per-bucket totals + exclusive prefix offsets DERIVE from the per-date
    # counts already on the driver — no second counting pass over the data
    date_bucket = np.searchsorted(cuts, dates["d_us"].to_numpy(np.int64),
                                  side="left")
    totals = np.bincount(date_bucket, weights=dates["n"].to_numpy(np.int64),
                         minlength=len(cuts) + 1).astype(np.int64)
    offsets = np.concatenate(([0], np.cumsum(totals)[:-1]))
    cuts_ref = ray.put(cuts)

    def bucketed(df: pd.DataFrame) -> pd.DataFrame:
        c = ray.get(cuts_ref)
        df = df.copy()
        df["bucket"] = np.searchsorted(c, df["d_us"].to_numpy(np.int64),
                                       side="left").astype(np.int64)
        return df

    bd = base.map_batches(bucketed, batch_format="pandas")

    def enumerate_bucket(df: pd.DataFrame) -> pd.DataFrame:
        order = np.lexsort((df["o_orderkey"].to_numpy(np.int64),
                            df["d_us"].to_numpy(np.int64)))
        rn = offsets[int(df["bucket"].iloc[0])] + np.arange(1, len(df) + 1)
        return pd.DataFrame({
            "o_orderkey": df["o_orderkey"].to_numpy(np.int64)[order],
            "rn": rn})

    return bd.groupby("bucket").map_groups(enumerate_bucket,
                                           batch_format="pandas")


def orders_global_rank_oracle_sql() -> str:
    return """
        SELECT o_orderkey,
               row_number() OVER (ORDER BY o_orderdate, o_orderkey) AS rn
        FROM orders"""


def order_priority_counts(sf_dir: str):
    """Distinct-ish rollup: order counts by (status, priority)."""
    ds = _read(sf_dir, "orders", ["o_orderstatus", "o_orderpriority"])

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        g = df.groupby(["o_orderstatus", "o_orderpriority"], sort=False).size() \
            .reset_index(name="partial_n")
        return pa.Table.from_pandas(g, preserve_index=False)

    return ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True) \
        .groupby(["o_orderstatus", "o_orderpriority"]) \
        .aggregate(Sum("partial_n", alias_name="n_orders"))


def prev_order_gap(sf_dir: str, num_partitions: int = 16):
    """Analytic LAG: per order, microseconds since the same customer's
    previous order (ties broken by orderkey).  One customer-hash shuffle,
    vectorized shift per partition — the grouped-window-function pattern."""
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])
    ds = add_partition_column(ds, key="o_custkey", num_partitions=num_partitions)

    def lag_gap(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["o_custkey", "o_orderdate", "o_orderkey"],
                            kind="mergesort")
        ts = df["o_orderdate"].to_numpy().astype("datetime64[us]").astype(np.int64)
        prev = np.empty(len(df), dtype=np.float64)
        prev[0] = np.nan
        prev[1:] = ts[:-1]
        same = np.empty(len(df), dtype=bool)
        same[0] = False
        key = df["o_custkey"].to_numpy()
        same[1:] = key[1:] == key[:-1]
        gap = np.where(same, ts - prev, np.nan)
        return pd.DataFrame({"o_orderkey": df["o_orderkey"].to_numpy(),
                             "o_custkey": key,
                             "gap_us": gap})

    return ds.groupby("part").map_groups(lag_gap, batch_format="pandas")


def running_revenue(sf_dir: str, num_partitions: int = 16):
    """Analytic cumulative SUM: running total of order value per customer in
    (orderdate, orderkey) order — grouped cumsum per hash partition."""
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate",
                                  "o_totalprice"])
    ds = add_partition_column(ds, key="o_custkey", num_partitions=num_partitions)

    def cum(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["o_custkey", "o_orderdate", "o_orderkey"],
                            kind="mergesort")
        run = df.groupby("o_custkey", sort=False)["o_totalprice"].cumsum()
        return pd.DataFrame({"o_orderkey": df["o_orderkey"].to_numpy(),
                             "o_custkey": df["o_custkey"].to_numpy(),
                             "running_total": round_half_away(run.to_numpy(), 2)})

    return ds.groupby("part").map_groups(cum, batch_format="pandas")


def moving_revenue_sum(sf_dir: str, window: int = 3, num_partitions: int = 16):
    """Analytic moving-window SUM: per customer, the sum of order value over
    the last ``window`` orders (ROWS ``window-1`` PRECEDING .. CURRENT) in
    (orderdate, orderkey) order — grouped rolling sum per hash partition.
    A SUM (not mean) so 2-decimal inputs land on 0.01 multiples in exact
    arithmetic and the round(2) on both sides can never straddle a
    half-boundary."""
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate",
                                  "o_totalprice"])
    ds = add_partition_column(ds, key="o_custkey", num_partitions=num_partitions)

    def roll(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["o_custkey", "o_orderdate", "o_orderkey"],
                            kind="mergesort")
        s = df.groupby("o_custkey", sort=False)["o_totalprice"] \
            .rolling(window, min_periods=1).sum() \
            .reset_index(level=0, drop=True)
        return pd.DataFrame({"o_orderkey": df["o_orderkey"].to_numpy(),
                             "o_custkey": df["o_custkey"].to_numpy(),
                             "moving_sum": round_half_away(s.to_numpy(), 2)})

    return ds.groupby("part").map_groups(roll, batch_format="pandas")


def users_with_events_and_orders(sf_dir: str, num_partitions: int = 16):
    """INTERSECT shape: distinct user ids present in BOTH the events stream
    and the orders table (the set-op sibling of the anti join in
    customers_without_urgent_orders).  Each side pre-distincts per batch
    (shuffle moves at most one row per (key, batch)), then one keyed
    co-location decides membership — never a row-level join of the raw
    tables."""
    import pyarrow as pa

    from ..stages.partition import add_partition_column

    def distinct_side(col: str, side: int):
        def fn(t: pa.Table) -> pa.Table:
            ids = pd.unique(t[col].to_pandas().dropna())
            return pa.table({"user_id": pa.array(ids.astype(np.int64)),
                             "side": pa.array(
                                 np.full(len(ids), side, np.int8))})
        return fn

    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id"]) \
        .map_batches(distinct_side("user_id", 0), batch_format="pyarrow",
                     zero_copy_batch=True)
    od = ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                               columns=["o_custkey"]) \
        .map_batches(distinct_side("o_custkey", 1), batch_format="pyarrow",
                     zero_copy_batch=True)
    u = add_partition_column(ev.union(od), key="user_id",
                             num_partitions=num_partitions)

    def intersect(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("user_id")["side"].nunique()
        return pd.DataFrame({"user_id": g.index[g == 2].to_numpy(np.int64)})

    return u.groupby("part").map_groups(intersect, batch_format="pandas")


def users_with_events_and_orders_oracle_sql() -> str:
    return """
        SELECT DISTINCT user_id FROM events WHERE user_id IS NOT NULL
        INTERSECT
        SELECT DISTINCT o_custkey AS user_id FROM orders
        WHERE o_custkey IS NOT NULL"""


def events_range_sum(sf_dir: str, window_us: int = 86_400_000_000,
                     num_partitions: int = 16):
    """Time-based RANGE-frame window aggregate: per event, the sum of the
    user's ``value`` over the trailing ``window_us`` of EVENT time
    (``RANGE BETWEEN w PRECEDING AND CURRENT ROW`` — the frame class the
    ROWS-based :func:`moving_revenue_sum` cannot express; sliding-window
    billing/rate metrics live here).

    One user-hash shuffle, then a vectorized time-window rolling sum per
    partition.  RANGE peer semantics (equal timestamps share one frame that
    includes ALL peers) are made exact by aggregating per DISTINCT
    (user, ts) first — pandas' time rolling would otherwise exclude later
    peers — and merging the frame value back to every event row."""
    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])
    ds = add_partition_column(ds, key="user_id",
                              num_partitions=num_partitions)

    def roll(df: pd.DataFrame) -> pd.DataFrame:
        df = df.dropna(subset=["user_id"])
        ts_us = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        base = pd.DataFrame({"user_id": df["user_id"].to_numpy(np.int64),
                             "ts_us": ts_us,
                             "value": df["value"].to_numpy(np.float64),
                             "event_id": df["event_id"].to_numpy(np.int64)})
        # RANGE peers: collapse to distinct (user, ts) so every peer row
        # sees the full same-timestamp frame
        g = base.groupby(["user_id", "ts_us"], as_index=False)["value"].sum() \
            .sort_values(["user_id", "ts_us"], kind="mergesort")
        idx = pd.to_datetime(g["ts_us"], unit="us")
        s = g.set_index(idx).groupby("user_id")["value"] \
            .rolling(pd.Timedelta(microseconds=window_us), closed="both") \
            .sum().reset_index(drop=True)
        g["range_sum"] = round_half_away(s.to_numpy(np.float64), 2)
        out = base.merge(g[["user_id", "ts_us", "range_sum"]],
                         on=["user_id", "ts_us"], how="left")
        return out[["event_id", "user_id", "range_sum"]]

    return ds.groupby("part").map_groups(roll, batch_format="pandas")


def events_range_sum_oracle_sql(window_us: int = 86_400_000_000) -> str:
    return f"""
        SELECT event_id, user_id,
               round(sum(value) OVER (
                   PARTITION BY user_id ORDER BY epoch_us(ts)
                   RANGE BETWEEN {window_us} PRECEDING AND CURRENT ROW), 2)
                   AS range_sum
        FROM events WHERE user_id IS NOT NULL"""


def customers_without_urgent_orders(sf_dir: str, num_partitions: int = 16,
                                    priority: str = "1-URGENT"):
    """ANTI join: customers who never placed an order of the given priority
    (`Dataset.join` left_anti — the set-difference shape every
    retention/backfill pipeline needs).  The right side pushes the priority
    filter INTO the scan and pre-distincts per batch, so the shuffle moves
    at most one row per (custkey, batch), not one per order."""
    cust = _read(sf_dir, "customer", ["c_custkey", "c_name"])

    def distinct_keys(t: pa.Table) -> pa.Table:
        df = t.to_pandas().drop_duplicates("o_custkey")[["o_custkey"]]
        return pa.Table.from_pandas(df, preserve_index=False)

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey"],
        filter=pc.equal(pc.field("o_orderpriority"), priority)) \
        .map_batches(distinct_keys, batch_format="pyarrow", zero_copy_batch=True)
    return cust.join(orders, join_type="left_anti",
                     num_partitions=num_partitions,
                     on=("c_custkey",), right_on=("o_custkey",))


def customer_order_counts(sf_dir: str, num_partitions: int = 16):
    """LEFT OUTER join with null-side fill: per-customer order counts
    INCLUDING zero-order customers.  Orders pre-aggregate per batch →
    one small keyed groupby → left_outer join against the customer table
    (both sides hash-shuffled once); the unmatched side's null count
    becomes 0."""
    cust = _read(sf_dir, "customer", ["c_custkey"])

    def partial(t: pa.Table) -> pa.Table:
        g = t.to_pandas().groupby("o_custkey", sort=False).size() \
            .reset_index(name="partial_n")
        return pa.Table.from_pandas(g, preserve_index=False)

    counts = _read(sf_dir, "orders", ["o_custkey"]) \
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True) \
        .groupby("o_custkey").aggregate(Sum("partial_n", alias_name="n"))
    joined = cust.join(counts, join_type="left_outer",
                       num_partitions=num_partitions,
                       on=("c_custkey",), right_on=("o_custkey",))

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "c_custkey": df["c_custkey"].to_numpy(np.int64),
            "n_orders": df["n"].fillna(0).to_numpy(np.int64)})

    return joined.map_batches(finish, batch_format="pandas")


def quantile_rollup(ds, key: str, value_col: str,
                    qs: tuple[float, ...], suffix: str):
    """Exact per-key quantiles of ``value_col`` as a DISTRIBUTED value-counts
    rollup — no per-group row materialization:

    1. per-batch ``(key, value) → count`` partials (map_batches; NULL
       key/value rows are excluded — oracle SQL must filter identically);
    2. ONE ``groupby(key)`` shuffle of those partials; the per-key fold
       collapses duplicate values in-memory (pandas groupby-sum) and runs
       the sorted cumulative-count selection.  A continuous value domain
       doesn't collapse in step 1, so a separate ``groupby([key, value])``
       pre-shuffle would move the same rows AGAIN — fusing both into the
       single key exchange halves the AllToAll count (each carries a
       ~2–5 s fixed cost at any size; see BASELINE.md session-7 notes).
       For a bounded-precision domain the partials DO collapse per batch,
       so the shuffle stays O(|domain| × batches) regardless of row count.

    Selection rule = sorted element at index ``ceil(q·n) − 1`` — DuckDB's
    ``quantile_disc``, an actual data element (no interpolation), so the
    oracle hash-matches without float-order sensitivity.  For unbounded/
    continuous domains at scale, swap stage 2's key for a fixed-width value
    histogram (the same topology, bounded by construction, approximate).
    Output columns: ``key, n, p{q}_{suffix}...``."""
    import math

    def partial(t: pa.Table) -> pa.Table:
        g = t.to_pandas().groupby([key, value_col], sort=False).size() \
            .reset_index(name="partial_n")
        # ARROW blocks in AND out: Ray's sort-based Aggregate on pandas
        # blocks falls into a row-wise object-comparison path (~100× slower);
        # Arrow blocks keep it on columnar kernels
        return pa.Table.from_pandas(g, preserve_index=False)

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)

    def select_quantiles(g: pd.DataFrame) -> pd.DataFrame:
        k = g[key].iloc[0]
        # collapse duplicate values from different batches; sort=True gives
        # the value-sorted order the cumulative selection needs
        g = g.groupby(value_col, sort=True)["partial_n"].sum() \
            .reset_index(name="n")
        n = int(g["n"].sum())
        cum = g["n"].cumsum().to_numpy()
        vals = g[value_col].to_numpy()
        row = {key: [k], "n": [n]}
        for q in qs:
            idx = min(max(math.ceil(q * n) - 1, 0), n - 1)
            # round, not truncate: int(0.29 * 100) == 28
            row[f"p{int(round(q * 100))}_{suffix}"] = \
                [vals[np.searchsorted(cum, idx + 1)]]
        return pd.DataFrame(row)

    return parts.groupby(key).map_groups(select_quantiles,
                                         batch_format="pandas")


def events_quantiles(sf_dir: str, qs: tuple[float, ...] = (0.5, 0.75, 0.95)):
    """Exact per-event-type quantiles of ``value`` (see quantile_rollup)."""
    ds = _read(sf_dir, "events", ["event_type", "value"])
    return quantile_rollup(ds, "event_type", "value", qs, suffix="value")


def quantile_cont_rollup(ds, key: str, value_col: str,
                         qs: tuple[float, ...], suffix: str):
    """Interpolated (``percentile_cont``) per-key quantiles over the SAME
    distributed value-counts topology as :func:`quantile_rollup` — only the
    final selection differs: DuckDB's ``quantile_cont`` formula ``RN =
    q·(n−1); (CRN−RN)·v[FRN] + (RN−FRN)·v[CRN]`` replayed with the identical
    IEEE operation order, so doubles hash-match the oracle bit-for-bit."""
    import math

    def partial(t: pa.Table) -> pa.Table:
        g = t.to_pandas().groupby([key, value_col], sort=False).size() \
            .reset_index(name="partial_n")
        return pa.Table.from_pandas(g, preserve_index=False)

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)

    def select_quantiles(g: pd.DataFrame) -> pd.DataFrame:
        k = g[key].iloc[0]
        g = g.groupby(value_col, sort=True)["partial_n"].sum() \
            .reset_index(name="n")
        n = int(g["n"].sum())
        cum = g["n"].cumsum().to_numpy()
        vals = g[value_col].to_numpy().astype(np.float64)

        def elem(i: int) -> float:  # i-th (0-based) of the sorted multiset
            return float(vals[np.searchsorted(cum, i + 1)])

        row = {key: [k], "n": [n]}
        for q in qs:
            rn = q * (n - 1)
            frn, crn = math.floor(rn), math.ceil(rn)
            v = elem(frn) if crn == frn else \
                (crn - rn) * elem(frn) + (rn - frn) * elem(crn)
            row[f"c{int(round(q * 100))}_{suffix}"] = [v]
        return pd.DataFrame(row)

    return parts.groupby(key).map_groups(select_quantiles,
                                         batch_format="pandas")


def events_quantiles_cont(sf_dir: str, qs: tuple[float, ...] = (0.5, 0.9)):
    """Interpolated per-event-type quantiles (see quantile_cont_rollup)."""
    ds = _read(sf_dir, "events", ["event_type", "value"])
    return quantile_cont_rollup(ds, "event_type", "value", qs, suffix="value")


ROLLUP_ALL = "ALL"


def order_priority_rollup(sf_dir: str):
    """GROUP BY ROLLUP (o_orderstatus, o_orderpriority) counts — three
    grouping levels from ONE scan: the finest aggregate runs distributed
    (per-batch partials → small groupby), coarser levels are derived from
    the finest's few-dozen rows driver-side (bounded by the grouping
    domain, never by row count).  Rolled-up columns carry the explicit
    ``'ALL'`` sentinel (both sides coalesce, avoiding NULL-repr drift)."""
    ds = _read(sf_dir, "orders", ["o_orderstatus", "o_orderpriority"])

    def partial(t: pa.Table) -> pa.Table:
        # NULL status/priority rows are excluded EXPLICITLY (the oracle
        # filters identically with IS NOT NULL) — relying on pandas' silent
        # NULL-key drop would let a null row collide with the 'ALL'
        # rollup sentinel on the SQL side
        g = t.to_pandas() \
            .dropna(subset=["o_orderstatus", "o_orderpriority"]) \
            .groupby(["o_orderstatus", "o_orderpriority"],
                     sort=False).size().reset_index(name="partial_n")
        return pa.Table.from_pandas(g, preserve_index=False)

    fine = _merge_bounded_partials(
        ds.map_batches(partial, batch_format="pyarrow",
                       zero_copy_batch=True),
        keys=["o_orderstatus", "o_orderpriority"], sums={"partial_n": "n"})
    if fine is None:
        fine = pd.DataFrame({"o_orderstatus": pd.Series([], dtype=object),
                             "o_orderpriority": pd.Series([], dtype=object),
                             "n": pd.Series([], dtype=np.int64)})
    by_status = fine.groupby("o_orderstatus", as_index=False)["n"].sum()
    by_status["o_orderpriority"] = ROLLUP_ALL
    total = pd.DataFrame({"o_orderstatus": [ROLLUP_ALL],
                          "o_orderpriority": [ROLLUP_ALL],
                          "n": [fine["n"].sum()]})
    out = pd.concat([fine, by_status, total], ignore_index=True)
    return out[["o_orderstatus", "o_orderpriority", "n"]] \
        .sort_values(["o_orderstatus", "o_orderpriority"]).reset_index(drop=True)


def order_priority_cube(sf_dir: str):
    """GROUP BY CUBE (o_orderstatus, o_orderpriority) counts — all FOUR
    grouping sets from ONE scan: the finest aggregate runs distributed
    (per-batch partials → small groupby), and the three coarser levels
    (by-status, by-priority, grand total) are derived from its few-dozen
    rows driver-side — bounded by the grouping domain, never row count.
    Extends :func:`order_priority_rollup` with the cross marginal a ROLLUP
    cannot produce; same ``'ALL'`` sentinel and NULL-filter discipline."""
    ds = _read(sf_dir, "orders", ["o_orderstatus", "o_orderpriority"])

    def partial(t: pa.Table) -> pa.Table:
        g = t.to_pandas() \
            .dropna(subset=["o_orderstatus", "o_orderpriority"]) \
            .groupby(["o_orderstatus", "o_orderpriority"],
                     sort=False).size().reset_index(name="partial_n")
        return pa.Table.from_pandas(g, preserve_index=False)

    fine = _merge_bounded_partials(
        ds.map_batches(partial, batch_format="pyarrow",
                       zero_copy_batch=True),
        keys=["o_orderstatus", "o_orderpriority"], sums={"partial_n": "n"})
    if fine is None:
        fine = pd.DataFrame({"o_orderstatus": pd.Series([], dtype=object),
                             "o_orderpriority": pd.Series([], dtype=object),
                             "n": pd.Series([], dtype=np.int64)})
    by_status = fine.groupby("o_orderstatus", as_index=False)["n"].sum()
    by_status["o_orderpriority"] = ROLLUP_ALL
    by_prio = fine.groupby("o_orderpriority", as_index=False)["n"].sum()
    by_prio["o_orderstatus"] = ROLLUP_ALL
    total = pd.DataFrame({"o_orderstatus": [ROLLUP_ALL],
                          "o_orderpriority": [ROLLUP_ALL],
                          "n": [fine["n"].sum()]})
    out = pd.concat([fine, by_status, by_prio, total], ignore_index=True)
    return out[["o_orderstatus", "o_orderpriority", "n"]] \
        .sort_values(["o_orderstatus", "o_orderpriority"]).reset_index(drop=True)


def event_user_cube(sf_dir: str):
    """GROUP BY CUBE (event_type, user_id) counts with user_id HIGH
    cardinality — the grouping-sets shape :func:`order_priority_cube`'s
    driver-side derivation must NOT be copied to (its domain is 15 rows;
    this one is O(users x types)).  Fully distributed instead: each batch
    computes its FINEST partial once, derives the three coarser partials
    from that already-tiny frame (per-batch domain-bounded work), and all
    four sets ride ONE groupby-sum shuffle keyed by the sentinel-completed
    (event_type, user_key) pair.  No grouping set ever materializes on the
    driver; result size is O(distinct user x type), returned as a Dataset.
    Rolled-up columns carry the ``'ALL'`` sentinel (user_id is cast to
    string so one column type spans both real keys and the sentinel, same
    on the oracle side)."""
    ds = _read(sf_dir, "events", ["user_id", "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        # null-filter in ARROW, before to_pandas: a nullable int64 column
        # with any null is promoted to float64 by to_pandas, silently
        # corrupting user_ids above 2^53 in exactly the null-carrying
        # batches (split keys, wrong counts)
        t = t.filter(pc.and_(pc.is_valid(t["user_id"]),
                             pc.is_valid(t["event_type"])))
        df = t.to_pandas()
        fine = pd.DataFrame({
            "event_type": df["event_type"].astype(str),
            "user_key": df["user_id"].astype(np.int64).astype(str),
        }).groupby(["event_type", "user_key"], sort=False) \
            .size().reset_index(name="partial_n")
        if len(fine) == 0:
            return pa.table({"event_type": pa.array([], pa.string()),
                             "user_key": pa.array([], pa.string()),
                             "partial_n": pa.array([], pa.int64())})
        by_type = fine.groupby("event_type", as_index=False)["partial_n"].sum()
        by_type["user_key"] = ROLLUP_ALL
        by_user = fine.groupby("user_key", as_index=False)["partial_n"].sum()
        by_user["event_type"] = ROLLUP_ALL
        total = pd.DataFrame({"event_type": [ROLLUP_ALL],
                              "user_key": [ROLLUP_ALL],
                              "partial_n": [int(fine["partial_n"].sum())]})
        out = pd.concat([fine, by_type, by_user, total], ignore_index=True)
        return pa.Table.from_pandas(
            out[["event_type", "user_key", "partial_n"]], preserve_index=False)

    # The () grouping set aggregates like a global COUNT: over zero valid
    # rows SQL still emits one (ALL, ALL, 0) row.  A zero-count seed row
    # unioned before the final groupby reproduces that exactly — it sums
    # away to the real grand total when input is non-empty and is the sole
    # survivor when it isn't — keeping the whole query distributed (no
    # driver-side emptiness probe that would execute the plan twice).
    seed = ray.data.from_arrow(pa.table({
        "event_type": pa.array([ROLLUP_ALL], pa.string()),
        "user_key": pa.array([ROLLUP_ALL], pa.string()),
        "partial_n": pa.array([0], pa.int64())}))
    return ds.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True) \
        .union(seed) \
        .groupby(["event_type", "user_key"]) \
        .aggregate(Sum("partial_n", alias_name="n"))


def event_user_cube_oracle_sql() -> str:
    return """
        SELECT coalesce(event_type, 'ALL') AS event_type,
               coalesce(CAST(user_id AS VARCHAR), 'ALL') AS user_key,
               count(*) AS n
        FROM events
        WHERE event_type IS NOT NULL AND user_id IS NOT NULL
        GROUP BY CUBE (event_type, user_id)"""


EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def user_event_pivot(sf_dir: str):
    """Per-user event-type count pivot (long → wide over the FIXED
    event-type domain, so the schema is stable by construction): one row per
    user_id with ``n_<type>`` columns.  Per-batch wide partials (vectorized
    crosstab) → one groupby-sum shuffle of user×5-int rows — the pivot never
    sees raw events after the batch partial."""
    ds = _read(sf_dir, "events", ["user_id", "event_type"])
    aggs = [Sum(f"n_{t}", alias_name=f"n_{t}") for t in EVENT_TYPES]

    def partial(t: pa.Table) -> pa.Table:
        # null user_id/event_type rows are excluded (crosstab would drop
        # them silently anyway) — the oracle SQL filters identically
        df = t.to_pandas().dropna(subset=["user_id", "event_type"])
        ct = pd.crosstab(df["user_id"], df["event_type"])
        for ty in EVENT_TYPES:
            if ty not in ct.columns:
                ct[ty] = 0
        ct = ct[list(EVENT_TYPES)].astype(np.int64)
        ct.columns = [f"n_{ty}" for ty in EVENT_TYPES]
        return pa.Table.from_pandas(ct.reset_index(), preserve_index=False)

    return ds.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True) \
        .groupby("user_id").aggregate(*aggs)


def events_windowed_stats(sf_dir: str, size_us: int = 86_400_000_000):
    """Daily tumbling per event_type: count / sum / min / max of value."""
    from ..stages.windows import windowed_stats

    ds = _read(sf_dir, "events", ["ts", "event_type", "value"])
    out = windowed_stats(ds, size_us, key="event_type", value_col="value").to_pandas()
    for c in ("sum_value", "min_value", "max_value"):
        out[c] = round_half_away(out[c], 2)
    return out


def cohort_retention(sf_dir: str, period_us: int = 7 * 86_400_000_000,
                     num_partitions: int = 16):
    """Cohort retention matrix (product-analytics staple): users bucketed by
    the period of their FIRST event; for each (cohort, periods_since) the
    number of DISTINCT users active in that period.

    ONE row shuffle, no join: hash-partition by ``user_id`` co-locates every
    user's events, so per partition the first-seen ``min(ts)`` is exact, the
    (cohort, period, user) cells deduplicate locally, and — because a user
    lives in exactly one partition — per-partition DISTINCT-user counts per
    cell SUM to the global distinct count.  The second shuffle then moves
    only (cohort, period, partial_n) partials (≤ cells × partitions rows,
    independent of event volume)."""
    from ..stages.partition import partitioned_map
    from ..stages.windows import ts_us_series

    ds = _read(sf_dir, "events", ["ts", "user_id"])

    def to_us(t: pa.Table) -> pa.Table:
        df = t.to_pandas().dropna(subset=["user_id"])
        return pa.table({"user_id": df["user_id"].to_numpy(np.int64),
                         "ts_us": ts_us_series(df["ts"])})

    ds = ds.map_batches(to_us, batch_format="pyarrow", zero_copy_batch=True)

    def cells_partial(df: pd.DataFrame) -> pd.DataFrame:
        mt = df.groupby("user_id", sort=False)["ts_us"].transform("min")
        cohort = mt.to_numpy(np.int64) // period_us
        period = df["ts_us"].to_numpy(np.int64) // period_us - cohort
        cells = pd.DataFrame({"cohort": cohort, "period": period,
                              "user_id": df["user_id"].to_numpy(np.int64)}) \
            .drop_duplicates()
        g = cells.groupby(["cohort", "period"], sort=False).size() \
            .reset_index(name="partial_n")
        return g

    parts = partitioned_map(ds, cells_partial, key="user_id",
                            num_partitions=num_partitions)
    return parts.groupby(["cohort", "period"]) \
        .aggregate(Sum("partial_n", alias_name="n_users"))


def cohort_retention_oracle_sql(period_us: int = 7 * 86_400_000_000) -> str:
    return f"""
        WITH f AS (SELECT user_id, min(epoch_us(ts)) AS mt
                   FROM events WHERE user_id IS NOT NULL GROUP BY user_id)
        SELECT f.mt // {period_us} AS cohort,
               epoch_us(e.ts) // {period_us} - f.mt // {period_us} AS period,
               count(DISTINCT e.user_id) AS n_users
        FROM events e JOIN f USING (user_id)
        GROUP BY 1, 2"""


def unpivot_user_events(sf_dir: str):
    """UNPIVOT (melt): the per-user event-type count matrix back to long
    (user_id, event_type, n) rows, zero-count cells dropped.  Wide→long is a
    pure per-batch flat transform — each batch emits ≤ |EVENT_TYPES| rows per
    input row with NO shuffle at all (the inverse pivot's aggregate already
    ran)."""
    wide = user_event_pivot(sf_dir)

    def melt(df: pd.DataFrame) -> pd.DataFrame:
        out = df.melt(id_vars=["user_id"],
                      value_vars=[f"n_{t}" for t in EVENT_TYPES],
                      var_name="event_type", value_name="n")
        out = out[out["n"] > 0]
        out["event_type"] = out["event_type"].str.removeprefix("n_")
        return out.reset_index(drop=True)

    return wide.map_batches(melt, batch_format="pandas")


def unpivot_oracle_sql() -> str:
    return """
        SELECT user_id, event_type, count(*) AS n
        FROM events
        WHERE user_id IS NOT NULL AND event_type IS NOT NULL
        GROUP BY user_id, event_type"""


def user_daily_activity(sf_dir: str, day_us: int = 86_400_000_000,
                        num_partitions: int = 16):
    """Gap-filled resampling (time-series densification): per user, the
    DAILY event count for EVERY day between the user's first and last
    event — zero-count days included.

    One user-hash partition co-locates each user's events; densification is
    partition-local and fully vectorized: per-user day spans expand with one
    ``np.repeat``/``arange`` pair (output bounded by users × active-span
    days, never touching other partitions), then observed counts merge in.
    No generate_series-style cross join and no global shuffle beyond the one
    keyed partition."""
    from ..stages.partition import partitioned_map
    from ..stages.windows import ts_us_series

    ds = _read(sf_dir, "events", ["ts", "user_id"])

    def to_day(t: pa.Table) -> pa.Table:
        df = t.to_pandas().dropna(subset=["user_id"])
        return pa.table({"user_id": df["user_id"].to_numpy(np.int64),
                         "day": ts_us_series(df["ts"]) // day_us})

    ds = ds.map_batches(to_day, batch_format="pyarrow", zero_copy_batch=True)

    def densify(df: pd.DataFrame) -> pd.DataFrame:
        counts = df.groupby(["user_id", "day"], sort=False).size() \
            .reset_index(name="n_events")
        span = counts.groupby("user_id", sort=False)["day"] \
            .agg(["min", "max"]).reset_index()
        lens = (span["max"] - span["min"] + 1).to_numpy(np.int64)
        users = np.repeat(span["user_id"].to_numpy(np.int64), lens)
        # per-user consecutive day ramp: global arange minus each span's
        # start offset, shifted by the span's first day
        offs = np.concatenate([[0], np.cumsum(lens)[:-1]])
        days = (np.arange(lens.sum(), dtype=np.int64)
                - np.repeat(offs, lens)
                + np.repeat(span["min"].to_numpy(np.int64), lens))
        dense = pd.DataFrame({"user_id": users, "day": days})
        out = dense.merge(counts, on=["user_id", "day"], how="left")
        out["n_events"] = out["n_events"].fillna(0).astype(np.int64)
        return out

    return partitioned_map(ds, densify, key="user_id",
                           num_partitions=num_partitions)


def user_daily_activity_oracle_sql(day_us: int = 86_400_000_000) -> str:
    return f"""
        WITH d AS (SELECT user_id, epoch_us(ts) // {day_us} AS day
                   FROM events WHERE user_id IS NOT NULL),
        span AS (SELECT user_id, min(day) AS d0, max(day) AS d1
                 FROM d GROUP BY user_id),
        dense AS (SELECT user_id, unnest(generate_series(d0, d1)) AS day
                  FROM span),
        c AS (SELECT user_id, day, count(*) AS n FROM d GROUP BY user_id, day)
        SELECT dense.user_id, dense.day,
               coalesce(c.n, 0) AS n_events
        FROM dense LEFT JOIN c USING (user_id, day)"""


def q14_promo_revenue(sf_dir: str, date_lo: str = "1995-01-01",
                      date_hi: str = "1995-04-01",
                      broadcast_threshold: int = 5_000_000):
    """TPC-H Q14 shape (promotion effect): CONDITIONAL aggregate over a
    broadcast dimension join — the percent of shipped revenue in a date
    range that comes from PROMO-type parts.

    Scale path: part's (p_partkey → is_promo) is a tiny broadcast (sorted
    parallel arrays, searchsorted probe per batch, same discipline as Q5);
    lineitem is scanned once with 4 pruned columns; each batch emits ONE
    partial (promo_rev, total_rev) pair so the reduce is O(blocks).
    part grows linearly with SF, so its broadcast is SIZE-GUARDED on the
    parquet-metadata row count: above ``broadcast_threshold`` the lineitem
    side pre-aggregates revenue per partkey and the promo flag attaches
    through the shared tag-union hash shuffle (:func:`_shuffle_attach`) —
    oracle-tested on both sides of the threshold."""
    import pyarrow.compute as _pc

    lo = np.datetime64(date_lo, "us")
    hi = np.datetime64(date_hi, "us")
    # date range pushed INTO the read: parquet row-group statistics prune
    # non-matching groups before their bytes leave storage
    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_extendedprice", "l_discount"],
        filter=(_pc.field("l_shipdate") >= lo)
        & (_pc.field("l_shipdate") < hi))

    if _dim_rows(sf_dir, "part") <= broadcast_threshold:
        part = _read_small_pd(sf_dir, "part", ["p_partkey", "p_type"]) \
            .sort_values("p_partkey")
        lookup_ref = ray.put((part["p_partkey"].to_numpy(np.int64),
                              (part["p_type"].to_numpy() == "PROMO")))

        def partial(t: pa.Table) -> pa.Table:
            keys, promo = ray.get(lookup_ref)
            df = t.to_pandas()
            rev = (df["l_extendedprice"] * (1 - df["l_discount"])).to_numpy()
            pk = df["l_partkey"].to_numpy(np.int64)
            pos = np.searchsorted(keys, pk).clip(max=max(len(keys) - 1, 0))
            is_promo = (keys[pos] == pk) & promo[pos] if len(keys) else \
                np.zeros(len(pk), bool)
            return pa.table({"promo_rev": pa.array([float(rev[is_promo].sum())]),
                             "total_rev": pa.array([float(rev.sum())])})

        agg = li.map_batches(partial, batch_format="pyarrow",
                             zero_copy_batch=True) \
            .aggregate(Sum("promo_rev", alias_name="p"),
                       Sum("total_rev", alias_name="t"))
    else:
        # over-threshold part: per-batch revenue pre-aggregation by partkey,
        # one hash shuffle attaching p_type (rows = distinct partkeys per
        # batch, never raw lineitem)
        def li_partial(t: pa.Table) -> pa.Table:
            df = t.to_pandas()
            rev = (df["l_extendedprice"] * (1 - df["l_discount"]))
            g = rev.groupby(df["l_partkey"]).sum().reset_index()
            g.columns = ["l_partkey", "rev"]
            return pa.Table.from_pandas(g, preserve_index=False)

        attached = _shuffle_attach(
            li.map_batches(li_partial, batch_format="pyarrow",
                           zero_copy_batch=True),
            "l_partkey", [("rev", pa.float64())],
            _read(sf_dir, "part", ["p_partkey", "p_type"]),
            "p_partkey", "p_type", "p_type")

        def fold(t: pa.Table) -> pa.Table:
            df = t.to_pandas()
            rev = df["rev"].to_numpy(np.float64)
            is_promo = df["p_type"].to_numpy() == "PROMO"
            return pa.table({"promo_rev": pa.array([float(rev[is_promo].sum())]),
                             "total_rev": pa.array([float(rev.sum())])})

        agg = attached.map_batches(fold, batch_format="pyarrow",
                                   zero_copy_batch=True) \
            .aggregate(Sum("promo_rev", alias_name="p"),
                       Sum("total_rev", alias_name="t"))
    pct = 100.0 * agg["p"] / agg["t"] if agg["t"] else 0.0
    return pd.DataFrame({"promo_pct": [float(round_half_away(
        np.array([pct]), 4)[0])]})


def q14_oracle_sql(date_lo: str = "1995-01-01",
                   date_hi: str = "1995-04-01") -> str:
    return f"""
        SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO'
                     THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
               / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_pct
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE l_shipdate >= TIMESTAMP '{date_lo}'
          AND l_shipdate < TIMESTAMP '{date_hi}'"""


def _q17_shuffle(sf_dir: str, part_ds, li_cols: list[str],
                 num_partitions: int) -> pd.DataFrame:
    """q17's over-threshold path: one tag-union hash shuffle of
    per-(partkey, quantity) lineitem partials with the brand's partkeys;
    thresholds and the qualifying-price sum derive per partition."""
    from ..stages.partition import add_partition_column as _add

    def li_partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        g = df.groupby(["l_partkey", "l_quantity"], sort=False).agg(
            n=("l_quantity", "size"),
            price=("l_extendedprice", "sum")).reset_index()
        return pa.table({
            "__key": pa.array(g["l_partkey"].to_numpy(np.int64)),
            "__side": pa.array(np.zeros(len(g), np.int8)),
            "qty": pa.array(g["l_quantity"].to_numpy(np.float64)),
            "n": pa.array(g["n"].to_numpy(np.int64)),
            "price": pa.array(g["price"].to_numpy(np.float64))})

    def dim_side(t: pa.Table) -> pa.Table:
        m = len(t)
        return pa.table({
            "__key": t["p_partkey"].cast(pa.int64()),
            "__side": pa.array(np.ones(m, np.int8)),
            "qty": pa.array(np.zeros(m, np.float64)),
            "n": pa.array(np.zeros(m, np.int64)),
            "price": pa.array(np.zeros(m, np.float64))})

    u = _read(sf_dir, "lineitem", li_cols) \
        .map_batches(li_partial, batch_format="pyarrow",
                     zero_copy_batch=True) \
        .union(part_ds.map_batches(dim_side, batch_format="pyarrow",
                                   zero_copy_batch=True))
    u = _add(u, key="__key", num_partitions=num_partitions)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        want = set(df.loc[df["__side"] == 1, "__key"])
        f = df[(df["__side"] == 0) & df["__key"].isin(want)]
        if not len(f):
            return pd.DataFrame({"price": pd.Series([], dtype=np.float64)})
        s = (f["qty"] * f["n"]).groupby(f["__key"]).sum()
        cnt = f["n"].groupby(f["__key"]).sum()
        thr = 0.2 * s / cnt
        sel = f["qty"].to_numpy() < thr.reindex(f["__key"]).to_numpy()
        return pd.DataFrame({"price": [float(f["price"].to_numpy()[sel].sum())]})

    total = u.groupby("part").map_groups(finish, batch_format="pandas") \
        .aggregate(Sum("price", alias_name="p"))["p"]
    if total is None:
        return pd.DataFrame({"avg_yearly": [np.nan]})
    return pd.DataFrame({"avg_yearly": [float(round_half_away(
        np.array([total / 7.0]), 2)[0])]})


def q17_small_quantity_revenue(sf_dir: str, brand: str = "Brand#13",
                               broadcast_threshold: int = 5_000_000,
                               num_partitions: int = 16):
    """TPC-H Q17 shape (small-quantity-order revenue): the CORRELATED
    SUBQUERY pattern — average yearly revenue lost if orders below 20%% of a
    part's average quantity weren't filled — decorrelated into two pruned
    lineitem passes with a broadcast per-part threshold between them.

    Pass 1 computes per-part (sum, count) PARTIALS restricted to the brand's
    partkeys (broadcast set from a FILTER-PUSHED part read — the brand
    predicate prunes at the scan, so only matching keys reach the driver);
    the per-part 0.2·avg thresholds are derived driver-side from the tiny
    aggregate and broadcast back; pass 2 re-scans lineitem and sums prices
    under threshold.  The shuffle never moves lineitem rows — only
    per-(part, batch) partials.

    Above ``broadcast_threshold`` brand keys, the whole query collapses to
    ONE tag-union hash shuffle instead: lineitem pre-reduces to
    per-(partkey, quantity) (n, price-sum) partials (l_quantity is a
    small-integer domain, so partials are tight), co-partitions with the
    brand's keys, and each partition derives its parts' thresholds and sums
    qualifying prices locally — exact because the (pk, qty) granularity
    preserves both the average and the filter (oracle-tested on both sides
    of the threshold)."""
    import pyarrow.compute as _pc

    part_ds = ray.data.read_parquet(
        f"{sf_dir}/part.parquet", columns=["p_partkey"],
        filter=_pc.field("p_brand") == brand)
    li_cols = ["l_partkey", "l_quantity", "l_extendedprice"]
    if int(part_ds.count()) > broadcast_threshold:
        return _q17_shuffle(sf_dir, part_ds, li_cols, num_partitions)
    bp = part_ds.to_pandas()
    pks = np.sort(bp["p_partkey"].to_numpy(np.int64)) \
        if len(bp) and "p_partkey" in bp.columns else np.array([], np.int64)
    pks_ref = ray.put(pks)

    def qty_partial(t: pa.Table) -> pa.Table:
        keys = ray.get(pks_ref)
        df = t.to_pandas()
        pk = df["l_partkey"].to_numpy(np.int64)
        pos = np.searchsorted(keys, pk).clip(max=max(len(keys) - 1, 0))
        hit = keys[pos] == pk if len(keys) else np.zeros(len(pk), bool)
        df = df[hit]
        g = df.groupby("l_partkey")["l_quantity"].agg(["sum", "count"]) \
            .reset_index()
        return pa.table({"l_partkey": pa.array(g["l_partkey"].to_numpy(np.int64)),
                         "s": pa.array(g["sum"].to_numpy(np.float64)),
                         "n": pa.array(g["count"].to_numpy(np.int64))})

    li_cols = ["l_partkey", "l_quantity", "l_extendedprice"]
    li = _read(sf_dir, "lineitem", li_cols)
    per_part = li.map_batches(qty_partial, batch_format="pyarrow",
                              zero_copy_batch=True) \
        .groupby("l_partkey").aggregate(Sum("s", alias_name="s"),
                                        Sum("n", alias_name="n")).to_pandas()
    if len(per_part) == 0:
        # oracle: sum over an empty set is NULL -> NaN, not 0.0
        return pd.DataFrame({"avg_yearly": [np.nan]})
    per_part = per_part.sort_values("l_partkey")
    thr_ref = ray.put((per_part["l_partkey"].to_numpy(np.int64),
                       0.2 * per_part["s"].to_numpy(np.float64)
                       / per_part["n"].to_numpy(np.float64)))

    def under_threshold(t: pa.Table) -> pa.Table:
        keys, thr = ray.get(thr_ref)
        df = t.to_pandas()
        pk = df["l_partkey"].to_numpy(np.int64)
        pos = np.searchsorted(keys, pk).clip(max=len(keys) - 1)
        hit = (keys[pos] == pk) \
            & (df["l_quantity"].to_numpy(np.float64) < thr[pos])
        return pa.table({"price": pa.array(
            [float(df["l_extendedprice"].to_numpy()[hit].sum())])})

    total = _read(sf_dir, "lineitem", li_cols) \
        .map_batches(under_threshold, batch_format="pyarrow",
                     zero_copy_batch=True) \
        .aggregate(Sum("price", alias_name="p"))["p"]
    if total is None:
        return pd.DataFrame({"avg_yearly": [np.nan]})
    return pd.DataFrame({"avg_yearly": [float(round_half_away(
        np.array([total / 7.0]), 2)[0])]})


def q17_oracle_sql(brand: str = "Brand#13") -> str:
    return f"""
        SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE p_brand = '{brand}'
          AND l_quantity < (SELECT 0.2 * avg(l_quantity) FROM lineitem l2
                            WHERE l2.l_partkey = part.p_partkey)"""


def q18_large_orders(sf_dir: str, threshold: float = 200.0):
    """TPC-H Q18 shape (large-volume customers): GROUP BY + HAVING as a
    distributed semijoin — orders whose total lineitem quantity exceeds a
    threshold, joined back to order/customer attributes.

    Per-batch per-order quantity partials → one small groupby(orderkey) →
    HAVING filter leaves FEW orderkeys (broadcast as a sorted array) →
    orders scan probes it (searchsorted) and decorates from a broadcast
    customer lookup.  Neither lineitem nor orders is ever shuffled."""
    from ray.data.aggregate import Sum as _Sum

    def qty_partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        g = df.groupby("l_orderkey")["l_quantity"].sum().reset_index()
        return pa.table({"l_orderkey": pa.array(g["l_orderkey"].to_numpy(np.int64)),
                         "q": pa.array(g["l_quantity"].to_numpy(np.float64))})

    def having(t: pa.Table) -> pa.Table:
        # HAVING applied cluster-side: only the FEW qualifying orders ever
        # reach the driver, not every order's total.
        if "total_qty" not in t.column_names:  # empty-input untyped block
            return t
        return t.filter(pc.greater(t["total_qty"], threshold))

    big = _read(sf_dir, "lineitem", ["l_orderkey", "l_quantity"]) \
        .map_batches(qty_partial, batch_format="pyarrow", zero_copy_batch=True) \
        .groupby("l_orderkey").aggregate(_Sum("q", alias_name="total_qty")) \
        .map_batches(having, batch_format="pyarrow", zero_copy_batch=True) \
        .to_pandas()
    if "total_qty" not in big.columns:  # empty lineitem: untyped frame
        big = pd.DataFrame({"l_orderkey": pd.Series([], dtype=np.int64),
                            "total_qty": pd.Series([], dtype=np.float64)})
    big = big.sort_values("l_orderkey")
    big_ref = ray.put((big["l_orderkey"].to_numpy(np.int64),
                       big["total_qty"].to_numpy(np.float64)))

    def decorate(t: pa.Table) -> pa.Table:
        oks, qty = ray.get(big_ref)
        df = t.to_pandas()
        ok = df["o_orderkey"].to_numpy(np.int64)
        pos = np.searchsorted(oks, ok).clip(max=max(len(oks) - 1, 0))
        hit = oks[pos] == ok if len(oks) else np.zeros(len(ok), bool)
        df = df[hit]
        df["total_qty"] = qty[pos[hit]]
        return pa.Table.from_pandas(
            df[["o_custkey", "o_orderkey", "o_orderdate",
                "o_totalprice", "total_qty"]], preserve_index=False)

    out = _read(sf_dir, "orders",
                ["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"]) \
        .map_batches(decorate, batch_format="pyarrow", zero_copy_batch=True) \
        .to_pandas()
    if "o_totalprice" not in out.columns:  # zero-block read: untyped frame
        return pd.DataFrame({c: pd.Series([], dtype=t) for c, t in (
            ("c_name", object), ("o_custkey", np.int64),
            ("o_orderkey", np.int64), ("o_orderdate", "datetime64[us]"),
            ("o_totalprice", np.float64), ("total_qty", np.float64))})
    # winner rows are FEW (the HAVING already filtered): names come from a
    # distributed point lookup, never a whole-customer driver read or
    # broadcast; the inner merge preserves "custkey absent from customer
    # must drop" semantics
    names = _probe_rows(sf_dir, "customer", "c_custkey",
                        ["c_custkey", "c_name"],
                        out["o_custkey"].to_numpy(np.int64))
    out = out.merge(names, left_on="o_custkey", right_on="c_custkey",
                    how="inner")
    out["o_totalprice"] = round_half_away(out["o_totalprice"], 2)
    out["total_qty"] = round_half_away(out["total_qty"], 2)
    return out[["c_name", "o_custkey", "o_orderkey", "o_orderdate",
                "o_totalprice", "total_qty"]] \
        .sort_values(["o_totalprice", "o_orderkey"],
                     ascending=[False, True]).reset_index(drop=True)


def q18_oracle_sql(threshold: float = 200.0) -> str:
    return f"""
        SELECT c_name, o_custkey, o_orderkey, o_orderdate,
               round(o_totalprice, 2) AS o_totalprice,
               round(sum(l_quantity), 2) AS total_qty
        FROM customer JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
        GROUP BY c_name, o_custkey, o_orderkey, o_orderdate, o_totalprice
        HAVING sum(l_quantity) > {threshold}"""


_Q19_ARMS = (("Brand#13", 10, 1.0, 20.0),
             ("Brand#19", 20, 10.0, 30.0),
             ("Brand#20", 30, 20.0, 40.0))


def _q19_shuffle(sf_dir: str, part_ds, num_partitions: int) -> pd.DataFrame:
    """q19's over-threshold path: lineitem pre-reduces to per-partkey
    revenue sums per quantity band (one per disjunction arm), tag-unions
    with the brand-filtered part rows, and each partition applies the
    (brand, size) arm selection locally."""
    from ..stages.partition import add_partition_column as _add

    def li_partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        qty = df["l_quantity"].to_numpy(np.float64)
        rev = (df["l_extendedprice"] * (1 - df["l_discount"])).to_numpy()
        pk = df["l_partkey"].to_numpy(np.int64)
        cols = {}
        for j, (_, _, lo, hi) in enumerate(_Q19_ARMS):
            cols[f"rev{j}"] = np.where((qty >= lo) & (qty <= hi), rev, 0.0)
        g = pd.DataFrame({"__key": pk, **cols}) \
            .groupby("__key", sort=False, as_index=False).sum()
        n = len(g)
        return pa.table({
            "__key": pa.array(g["__key"].to_numpy(np.int64)),
            "__side": pa.array(np.zeros(n, np.int8)),
            "p_brand": pa.array([""] * n, pa.string()),
            "p_size": pa.array(np.zeros(n, np.int64)),
            **{f"rev{j}": pa.array(g[f"rev{j}"].to_numpy(np.float64))
               for j in range(len(_Q19_ARMS))}})

    def dim_side(t: pa.Table) -> pa.Table:
        n = len(t)
        return pa.table({
            "__key": t["p_partkey"].cast(pa.int64()),
            "__side": pa.array(np.ones(n, np.int8)),
            "p_brand": t["p_brand"].cast(pa.string()),
            "p_size": t["p_size"].cast(pa.int64()),
            **{f"rev{j}": pa.array(np.zeros(n, np.float64))
               for j in range(len(_Q19_ARMS))}})

    u = _read(sf_dir, "lineitem",
              ["l_partkey", "l_quantity", "l_extendedprice", "l_discount"]) \
        .map_batches(li_partial, batch_format="pyarrow",
                     zero_copy_batch=True) \
        .union(part_ds.map_batches(dim_side, batch_format="pyarrow",
                                   zero_copy_batch=True))
    u = _add(u, key="__key", num_partitions=num_partitions)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        d = df[df["__side"] == 1][["__key", "p_brand", "p_size"]]
        f = df[df["__side"] == 0].merge(d, on="__key", how="inner",
                                        suffixes=("_x", ""))
        if not len(f):
            return pd.DataFrame({"revenue": pd.Series([], dtype=np.float64)})
        total = 0.0
        for j, (brand, size_max, _, _) in enumerate(_Q19_ARMS):
            m = (f["p_brand"].to_numpy() == brand) \
                & (f["p_size"].to_numpy(np.int64) <= size_max)
            total += float(f[f"rev{j}"].to_numpy()[m].sum())
        return pd.DataFrame({"revenue": [total]})

    total = u.groupby("part").map_groups(finish, batch_format="pandas") \
        .aggregate(Sum("revenue", alias_name="r"))["r"]
    return pd.DataFrame({"revenue": [float(round_half_away(
        np.array([total or 0.0]), 2)[0])]})


def q19_disjunctive_revenue(sf_dir: str,
                            broadcast_threshold: int = 5_000_000,
                            num_partitions: int = 16):
    """TPC-H Q19 shape (discounted revenue, disjunctive predicates): an OR
    of three (brand, size-range, quantity-range) conjunctions spanning two
    tables — the classic case where a naive plan joins first and filters
    later.  Here part's (brand, size) is a broadcast columnar lookup —
    pre-filtered AT THE READ to the three named brands, since no other part
    can satisfy the disjunction — and the whole disjunction evaluates as
    THREE vectorized masks per lineitem batch; each batch emits one revenue
    partial.  Above ``broadcast_threshold`` matching parts, lineitem
    pre-reduces to per-partkey revenue sums per quantity BAND (one per
    disjunction arm; the arms' brands are mutually exclusive per part, so
    the per-partition join picks exactly one band) and ONE tag-union hash
    shuffle finishes — oracle-tested on both sides of the threshold."""
    import pyarrow.compute as _pc

    part_ds = ray.data.read_parquet(
        f"{sf_dir}/part.parquet",
        columns=["p_partkey", "p_brand", "p_size"],
        filter=_pc.field("p_brand").isin([a[0] for a in _Q19_ARMS]))
    if int(part_ds.count()) > broadcast_threshold:
        return _q19_shuffle(sf_dir, part_ds, num_partitions)
    part = part_ds.to_pandas()
    if not len(part) or "p_partkey" not in part.columns:
        part = pd.DataFrame({"p_partkey": pd.Series([], dtype=np.int64),
                             "p_brand": pd.Series([], dtype=object),
                             "p_size": pd.Series([], dtype=np.int64)})
    part = part.sort_values("p_partkey")
    ref = ray.put((part["p_partkey"].to_numpy(np.int64),
                   part["p_brand"].to_numpy(),
                   part["p_size"].to_numpy(np.int64)))

    def partial(t: pa.Table) -> pa.Table:
        keys, brands, sizes = ray.get(ref)
        df = t.to_pandas()
        pk = df["l_partkey"].to_numpy(np.int64)
        pos = np.searchsorted(keys, pk).clip(max=max(len(keys) - 1, 0))
        if not len(keys):
            return pa.table({"revenue": pa.array([0.0])})
        hit = keys[pos] == pk
        qty = df["l_quantity"].to_numpy(np.float64)
        b, s = brands[pos], sizes[pos]
        m = hit & (((b == "Brand#13") & (s <= 10) & (qty >= 1) & (qty <= 20))
                   | ((b == "Brand#19") & (s <= 20) & (qty >= 10) & (qty <= 30))
                   | ((b == "Brand#20") & (s <= 30) & (qty >= 20) & (qty <= 40)))
        rev = (df["l_extendedprice"] * (1 - df["l_discount"])).to_numpy()
        return pa.table({"revenue": pa.array([float(rev[m].sum())])})

    total = _read(sf_dir, "lineitem",
                  ["l_partkey", "l_quantity", "l_extendedprice", "l_discount"]) \
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True) \
        .aggregate(Sum("revenue", alias_name="r"))["r"]
    return pd.DataFrame({"revenue": [float(round_half_away(
        np.array([total or 0.0]), 2)[0])]})


def q19_oracle_sql() -> str:
    return """
        SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE (p_brand = 'Brand#13' AND p_size <= 10
               AND l_quantity BETWEEN 1 AND 20)
           OR (p_brand = 'Brand#19' AND p_size <= 20
               AND l_quantity BETWEEN 10 AND 30)
           OR (p_brand = 'Brand#20' AND p_size <= 30
               AND l_quantity BETWEEN 20 AND 40)"""


def customers_without_events(sf_dir: str, num_partitions: int = 16):
    """EXCEPT shape: distinct customer ids present in orders but NOT in the
    events stream —
    completes the set-op family (INTERSECT in
    :func:`users_with_events_and_orders`, anti join in
    :func:`customers_without_urgent_orders`).  Same scale discipline: both
    sides pre-distinct per batch, one keyed co-location decides membership."""
    from ..stages.partition import add_partition_column as _add

    def distinct_side(col: str, side: int):
        def fn(t: pa.Table) -> pa.Table:
            ids = pd.unique(t[col].to_pandas().dropna())
            return pa.table({"user_id": pa.array(ids.astype(np.int64)),
                             "side": pa.array(np.full(len(ids), side, np.int8))})
        return fn

    od = ray.data.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_custkey"]) \
        .map_batches(distinct_side("o_custkey", 0), batch_format="pyarrow",
                     zero_copy_batch=True)
    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"]) \
        .map_batches(distinct_side("user_id", 1), batch_format="pyarrow",
                     zero_copy_batch=True)
    u = _add(od.union(ev), key="user_id", num_partitions=num_partitions)

    def except_(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("user_id")["side"].max()
        return pd.DataFrame({"user_id": g.index[g == 0].to_numpy(np.int64)})

    return u.groupby("part").map_groups(except_, batch_format="pandas")


def customers_without_events_oracle_sql() -> str:
    return """
        SELECT DISTINCT o_custkey AS user_id FROM orders
        WHERE o_custkey IS NOT NULL
        EXCEPT
        SELECT DISTINCT user_id FROM events WHERE user_id IS NOT NULL"""


def bloom_semijoin_revenue(sf_dir: str, nationkey: int = 3,
                           num_partitions: int = 16,
                           m_bits: int = 1 << 16):
    """Bloom-filtered SEMIJOIN: revenue per supplier restricted to one
    nation's suppliers, with the key side summarized as a broadcast Bloom
    filter (``functions/bloom.py``) probed inside the fact scan.

    The scale story: at 100 TB the key set may be too large to broadcast
    exactly, but its m-bit Bloom is a constant-size broadcast that prunes
    the fact scan BEFORE the shuffle — only rows that (probably) match emit
    partials.  Bloom false positives cannot leak into the result: the
    surviving per-(suppkey, batch) partials are co-located with the exact
    key rows by ONE hash partition and verified there (no false negatives
    by construction, so nothing true is lost).  Output: ``(l_suppkey,
    revenue)`` for the nation's suppliers that shipped anything."""
    from ..functions.bloom import bloom_from_dataset

    sup = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]) \
        .map_batches(lambda t: t.filter(
            pc.equal(t["s_nationkey"], nationkey)).select(["s_suppkey"]),
            batch_format="pyarrow", zero_copy_batch=True)
    bloom = bloom_from_dataset(sup, "s_suppkey", m_bits=m_bits)
    bloom_ref = ray.put(bloom)

    def li_partial(t: pa.Table) -> pa.Table:
        bf = ray.get(bloom_ref)
        df = t.to_pandas()
        sk = df["l_suppkey"].to_numpy(np.int64)
        cand = bf.contains(sk)  # pre-filter: drops ~everything non-matching
        df = df[cand]
        rev = (df["l_extendedprice"] * (1 - df["l_discount"])).to_numpy()
        g = pd.DataFrame({"user_id": df["l_suppkey"].to_numpy(np.int64),
                          "rev": rev}).groupby("user_id", sort=False)["rev"] \
            .sum().reset_index()
        return pa.table({"user_id": pa.array(g["user_id"].to_numpy(np.int64)),
                         "rev": pa.array(g["rev"].to_numpy(np.float64)),
                         "side": pa.array(np.zeros(len(g), np.int8))})

    li = _read(sf_dir, "lineitem",
               ["l_suppkey", "l_extendedprice", "l_discount"]) \
        .map_batches(li_partial, batch_format="pyarrow", zero_copy_batch=True)
    keys = sup.map_batches(
        lambda t: pa.table({"user_id": t["s_suppkey"],
                            "rev": pa.array(np.zeros(len(t), np.float64)),
                            "side": pa.array(np.ones(len(t), np.int8))}),
        batch_format="pyarrow", zero_copy_batch=True)
    u = add_partition_column(li.union(keys), key="user_id",
                             num_partitions=num_partitions)

    def verify(df: pd.DataFrame) -> pd.DataFrame:
        # exact semijoin per partition: a suppkey survives iff a key row
        # (side=1) is present — bloom false positives die here
        side = df["side"].to_numpy()
        fact = df[side == 0].groupby("user_id")["rev"].sum()
        fact = fact[fact.index.isin(df.loc[side == 1, "user_id"].unique())]
        return pd.DataFrame({
            "l_suppkey": fact.index.to_numpy(np.int64),
            "revenue": round_half_away(fact.to_numpy(np.float64), 2)})

    return u.groupby("part").map_groups(verify, batch_format="pandas")


def bloom_semijoin_oracle_sql(nationkey: int = 3) -> str:
    return f"""
        SELECT l_suppkey,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem
        WHERE l_suppkey IN (SELECT s_suppkey FROM supplier
                            WHERE s_nationkey = {nationkey})
        GROUP BY l_suppkey"""


def user_activity_outer(sf_dir: str, num_partitions: int = 16):
    """FULL OUTER JOIN shape: per-user event count ⟗ per-user order count —
    completes the join family (inner stream_join, as-of both directions,
    range, semi via bloom, anti, INTERSECT/EXCEPT).  Missing sides surface
    as NULL counts, exactly like the SQL FULL OUTER.

    Scale path: both sides pre-aggregate per batch (the shuffle moves
    per-(user, batch) partials), one shared user-hash co-location, and the
    outer merge is a vectorized per-partition pivot — no row-level join of
    the raw tables and no driver materialization."""

    def side_counts(col: str, side: int):
        def fn(t: pa.Table) -> pa.Table:
            vc = t[col].to_pandas().dropna().astype(np.int64).value_counts()
            return pa.table({
                "user_id": pa.array(vc.index.to_numpy(np.int64)),
                "n": pa.array(vc.to_numpy(np.int64)),
                "side": pa.array(np.full(len(vc), side, np.int8))})
        return fn

    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"]) \
        .map_batches(side_counts("user_id", 0), batch_format="pyarrow",
                     zero_copy_batch=True)
    od = ray.data.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_custkey"]) \
        .map_batches(side_counts("o_custkey", 1), batch_format="pyarrow",
                     zero_copy_batch=True)
    u = add_partition_column(ev.union(od), key="user_id",
                             num_partitions=num_partitions)

    def outer(df: pd.DataFrame) -> pd.DataFrame:
        p = df.pivot_table(index="user_id", columns="side", values="n",
                           aggfunc="sum")  # absent side -> NaN (SQL NULL)
        return pd.DataFrame({
            "user_id": p.index.to_numpy(np.int64),
            "n_events": p[0].to_numpy(np.float64) if 0 in p else
                np.full(len(p), np.nan),
            "n_orders": p[1].to_numpy(np.float64) if 1 in p else
                np.full(len(p), np.nan)})

    return u.groupby("part").map_groups(outer, batch_format="pandas")


def user_activity_outer_oracle_sql() -> str:
    return """
        SELECT coalesce(e.user_id, o.user_id) AS user_id,
               CAST(e.n AS DOUBLE) AS n_events,
               CAST(o.n AS DOUBLE) AS n_orders
        FROM (SELECT user_id, count(*) AS n FROM events
              WHERE user_id IS NOT NULL GROUP BY user_id) e
        FULL OUTER JOIN
             (SELECT o_custkey AS user_id, count(*) AS n FROM orders
              WHERE o_custkey IS NOT NULL GROUP BY o_custkey) o
        ON e.user_id = o.user_id"""


def events_window_distinct(sf_dir: str, day_us: int = 86_400_000_000,
                           num_partitions: int = 16):
    """Windowed COUNT DISTINCT (batch twin of the streaming ``wdistinct``
    stream): distinct event types per (user, tumbling day window).

    Scale path: each batch pre-distincts its (user, window, type) triples —
    the shuffle moves at most one row per (user, day, type, batch), never
    raw events — then one keyed co-location counts distinct types per cell
    with a vectorized drop_duplicates + groupby size."""
    from ..stages.windows import ts_us_series

    def pre_distinct(df: pd.DataFrame) -> pd.DataFrame:
        df = df.dropna(subset=["user_id"])  # mirror the oracle's IS NOT NULL
        w = (ts_us_series(df["ts"]) // day_us) * day_us
        out = pd.DataFrame({"user_id": df["user_id"].to_numpy(np.int64),
                            "window_start_us": w,
                            "event_type": df["event_type"].to_numpy()})
        return out.drop_duplicates()

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "ts", "event_type"]) \
        .map_batches(pre_distinct, batch_format="pandas")
    ds = add_partition_column(ds, key="user_id",
                              num_partitions=num_partitions)

    def count_distinct(df: pd.DataFrame) -> pd.DataFrame:
        d = df.drop_duplicates(["user_id", "window_start_us", "event_type"])
        g = d.groupby(["user_id", "window_start_us"]).size()
        idx = g.index.to_frame(index=False)
        return pd.DataFrame({"user_id": idx["user_id"].to_numpy(np.int64),
                             "window_start_us":
                                 idx["window_start_us"].to_numpy(np.int64),
                             "n_types": g.to_numpy(np.int64)})

    return ds.groupby("part").map_groups(count_distinct,
                                         batch_format="pandas")


def events_window_distinct_oracle_sql(day_us: int = 86_400_000_000) -> str:
    return f"""
        SELECT user_id,
               (epoch_us(ts) // {day_us}) * {day_us} AS window_start_us,
               count(DISTINCT event_type) AS n_types
        FROM events WHERE user_id IS NOT NULL
        GROUP BY user_id, window_start_us"""


def top_customers_with_ties(sf_dir: str, k: int = 3):
    """Top-k BY DENSE RANK WITH TIES: every customer whose order COUNT is
    among the k largest distinct counts (the ``DENSE_RANK() <= k`` shape —
    unlike a LIMIT top-k, ties at the boundary all survive).

    Scale path: per-batch per-customer partial counts → one keyed groupby →
    each count-block contributes its ≤ k largest DISTINCT values (tiny) →
    the driver merges O(k × blocks) scalars into the k admitted values,
    broadcast as a sorted array → one vectorized probe assigns ranks.  The
    full aggregate is never collected."""
    def partial(t: pa.Table) -> pa.Table:
        vc = t["o_custkey"].to_pandas().dropna().astype(np.int64).value_counts()
        return pa.table({"o_custkey": pa.array(vc.index.to_numpy(np.int64)),
                         "n": pa.array(vc.to_numpy(np.int64))})

    counts = _read(sf_dir, "orders", ["o_custkey"]) \
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True) \
        .groupby("o_custkey").aggregate(Sum("n", alias_name="n_orders"))

    def block_topvals(t: pa.Table) -> pa.Table:
        vals = np.unique(t["n_orders"].to_numpy(zero_copy_only=False))[::-1][:k]
        return pa.table({"v": pa.array(vals.astype(np.int64))})

    tops = counts.map_batches(block_topvals, batch_format="pyarrow",
                              zero_copy_batch=True).to_pandas()
    admitted = np.unique(tops["v"].to_numpy(np.int64))[::-1][:k] \
        if len(tops) else np.zeros(0, np.int64)  # desc
    adm_ref = ray.put(admitted)

    def pick(t: pa.Table) -> pa.Table:
        adm = ray.get(adm_ref)
        df = t.to_pandas()
        n = df["n_orders"].to_numpy(np.int64)
        # rank i+1 for the i-th largest admitted value; drop the rest
        rank = np.full(len(df), 0, np.int64)
        for i, v in enumerate(adm):  # loop over k, not rows
            rank[n == v] = i + 1
        keep = rank > 0
        return pa.table({"o_custkey": pa.array(
            df["o_custkey"].to_numpy(np.int64)[keep]),
            "n_orders": pa.array(n[keep]),
            "rnk": pa.array(rank[keep])})

    return counts.map_batches(pick, batch_format="pyarrow",
                              zero_copy_batch=True)


def top_customers_with_ties_oracle_sql(k: int = 3) -> str:
    return f"""
        SELECT o_custkey, count(*) AS n_orders,
               dense_rank() OVER (ORDER BY count(*) DESC) AS rnk
        FROM orders WHERE o_custkey IS NOT NULL
        GROUP BY o_custkey
        QUALIFY rnk <= {k}"""


def orders_yoy_growth(sf_dir: str):
    """Window-over-aggregate: per-year revenue with year-over-year growth
    percent (LAG over an ORDERED tiny aggregate).  The full scan reduces to
    one row per year (per-batch partials → one small groupby); the lag runs
    driver-side over |years| rows — the aggregate IS the small side, so
    driver finishing is the honest plan at any corpus size."""
    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        y = df["o_orderdate"].to_numpy("datetime64[Y]").astype(np.int64) + 1970
        g = pd.DataFrame({"y": y, "r": df["o_totalprice"].to_numpy(np.float64)}) \
            .groupby("y")["r"].sum().reset_index()
        return pa.table({"year": pa.array(g["y"].to_numpy(np.int64)),
                         "revenue": pa.array(g["r"].to_numpy(np.float64))})

    # year-domain-bounded partials: streamed driver fold (a Dataset groupby
    # would pay a full AllToAll fixed cost to merge a few dozen rows)
    agg = _merge_bounded_partials(
        _read(sf_dir, "orders", ["o_orderdate", "o_totalprice"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        keys=["year"], sums={"revenue": "revenue"})
    if agg is None:
        agg = pd.DataFrame({"year": pd.Series([], dtype=np.int64),
                            "revenue": pd.Series([], dtype=np.float64)})
    agg = agg.sort_values("year").reset_index(drop=True)
    prev = agg["revenue"].shift(1)
    yoy = 100.0 * (agg["revenue"] - prev) / prev
    return pd.DataFrame({
        "year": agg["year"].to_numpy(np.int64),
        "revenue": round_half_away(agg["revenue"].to_numpy(np.float64), 2),
        "yoy_pct": round_half_away(yoy.to_numpy(np.float64), 4)})


def orders_yoy_growth_oracle_sql() -> str:
    return """
        WITH a AS (SELECT year(o_orderdate) AS year,
                          sum(o_totalprice) AS revenue
                   FROM orders GROUP BY 1)
        SELECT year, round(revenue, 2) AS revenue,
               round(100.0 * (revenue - lag(revenue) OVER (ORDER BY year))
                     / lag(revenue) OVER (ORDER BY year), 4) AS yoy_pct
        FROM a"""


def q6_forecast_revenue(sf_dir: str, date_lo: str = "1995-01-01",
                        date_hi: str = "1996-01-01",
                        disc_lo: float = 0.02, disc_hi: float = 0.06,
                        qty_max: float = 24.0):
    """TPC-H Q6 (forecasting revenue change): pure filter + aggregate, with
    the row predicates PUSHED INTO THE READ — the shipdate/discount/quantity
    filter is a pyarrow dataset expression handed to ``read_parquet``, so
    non-matching row groups are pruned by parquet statistics before their
    bytes leave storage (at 100 TB, a date-partitioned layout makes this the
    difference between scanning a year and scanning everything).  Each
    surviving batch emits one partial; the reduce is O(blocks)."""
    import pyarrow.compute as _pc

    lo = np.datetime64(date_lo, "us")
    hi = np.datetime64(date_hi, "us")
    expr = ((_pc.field("l_shipdate") >= lo) & (_pc.field("l_shipdate") < hi)
            & (_pc.field("l_discount") >= disc_lo)
            & (_pc.field("l_discount") <= disc_hi)
            & (_pc.field("l_quantity") < qty_max))

    def partial(t: pa.Table) -> pa.Table:
        rev = pc.sum(pc.multiply(t["l_extendedprice"], t["l_discount"]))
        return pa.table({"revenue": pa.array(
            [float(rev.as_py() or 0.0)])})

    total = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_extendedprice", "l_discount"],
        filter=expr) \
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True) \
        .aggregate(Sum("revenue", alias_name="r"))["r"]
    return pd.DataFrame({"revenue": [float(round_half_away(
        np.array([total or 0.0]), 2)[0])]})


def q6_oracle_sql(date_lo: str = "1995-01-01", date_hi: str = "1996-01-01",
                  disc_lo: float = 0.02, disc_hi: float = 0.06,
                  qty_max: float = 24.0) -> str:
    return f"""
        SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '{date_lo}'
          AND l_shipdate < TIMESTAMP '{date_hi}'
          AND l_discount BETWEEN {disc_lo} AND {disc_hi}
          AND l_quantity < {qty_max}"""


def q10_returned_items(sf_dir: str, date_lo: str = "1995-04-01",
                       date_hi: str = "1995-07-01", k: int = 20):
    """TPC-H Q10 shape (returned-item reporting): top-k customers by revenue
    lost to returns in one quarter — filter both fact sides at the READ
    (order-date range and ``l_returnflag = 'R'`` are pyarrow pushdown
    expressions), join through a broadcast of the quarter's (orderkey →
    custkey) pairs (~1/28 of orders; same small-side-broadcast regime as Q3,
    whose size-guard/fallback pattern applies if the window grows), partial
    per-(custkey, batch) revenue sums, then partial top-k per count block →
    O(k × blocks) driver merge (the ann_topk reduce pattern).  Ranking uses
    the ROUNDED revenue on both engine and oracle sides so float ulps can't
    flip the boundary."""
    import pyarrow.compute as _pc

    lo = np.datetime64(date_lo, "us")
    hi = np.datetime64(date_hi, "us")
    od = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"],
        filter=(_pc.field("o_orderdate") >= lo)
        & (_pc.field("o_orderdate") < hi)).to_pandas()
    if len(od) == 0:  # empty window: a zero-row read drops its columns
        od = pd.DataFrame({"o_orderkey": pd.Series([], dtype=np.int64),
                           "o_custkey": pd.Series([], dtype=np.int64)})
    od = od.sort_values("o_orderkey")
    ok_ref = ray.put((od["o_orderkey"].to_numpy(np.int64),
                      od["o_custkey"].to_numpy(np.int64)))

    def partial(t: pa.Table) -> pa.Table:
        oks, cks = ray.get(ok_ref)
        df = t.to_pandas()
        o = df["l_orderkey"].to_numpy(np.int64)
        pos = np.searchsorted(oks, o).clip(max=max(len(oks) - 1, 0))
        hit = oks[pos] == o if len(oks) else np.zeros(len(o), bool)
        df = df[hit]
        rev = (df["l_extendedprice"] * (1 - df["l_discount"])).to_numpy()
        g = pd.DataFrame({"c": cks[pos[hit]], "r": rev}) \
            .groupby("c")["r"].sum().reset_index()
        return pa.table({"c_custkey": pa.array(g["c"].to_numpy(np.int64)),
                         "revenue": pa.array(g["r"].to_numpy(np.float64))})

    totals = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
        filter=_pc.field("l_returnflag") == "R") \
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True) \
        .groupby("c_custkey").aggregate(Sum("revenue", alias_name="revenue"))

    def block_topk(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(revenue=round_half_away(
            df["revenue"].to_numpy(np.float64), 2))
        return df.sort_values(["revenue", "c_custkey"],
                              ascending=[False, True]).head(k)

    parts = totals.map_batches(block_topk, batch_format="pandas") \
        .to_pandas()
    if "revenue" not in parts.columns:  # zero-block aggregate: no schema
        parts = pd.DataFrame({"c_custkey": pd.Series([], dtype=np.int64),
                              "revenue": pd.Series([], dtype=np.float64)})
    top = parts.sort_values(["revenue", "c_custkey"],
                            ascending=[False, True]).head(k)
    # <= k winners: names via distributed point lookup, never a whole-
    # customer driver read (inner merge keeps unknown-custkey drop semantics)
    names = _probe_rows(sf_dir, "customer", "c_custkey",
                        ["c_custkey", "c_name"],
                        top["c_custkey"].to_numpy(np.int64))
    top = top.merge(names, on="c_custkey", how="inner")
    top = top.sort_values(["revenue", "c_custkey"],
                          ascending=[False, True])
    return top[["c_custkey", "c_name", "revenue"]].reset_index(drop=True)


def q10_oracle_sql(date_lo: str = "1995-04-01", date_hi: str = "1995-07-01",
                   k: int = 20) -> str:
    return f"""
        SELECT c_custkey, c_name,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        WHERE o_orderdate >= TIMESTAMP '{date_lo}'
          AND o_orderdate < TIMESTAMP '{date_hi}'
          AND l_returnflag = 'R'
        GROUP BY c_custkey, c_name
        ORDER BY round(sum(l_extendedprice * (1 - l_discount)), 2) DESC,
                 c_custkey
        LIMIT {k}"""


def user_daily_locf(sf_dir: str, day_us: int = 86_400_000_000,
                    num_partitions: int = 16):
    """LOCF forward fill (last observation carried forward) over a dense
    per-user day grid: each user's LAST event type of each day (by ts, then
    event_id), densified to every day in the user's active span, with
    observation-free days inheriting the most recent prior value — the
    time-series window shape `last_value(... IGNORE NULLS)` that plain
    gap-filling (:func:`user_daily_activity`) doesn't cover.

    Same scale plan as the gap-fill op: one user-hash co-location, per-user
    span expansion via one repeat/arange pair, then a vectorized grouped
    ffill.  Returns ``(user_id, day_us, last_type)``."""
    from ..stages.partition import partitioned_map
    from ..stages.windows import ts_us_series

    ds = _read(sf_dir, "events", ["ts", "user_id", "event_id", "event_type"])

    def to_day(t: pa.Table) -> pa.Table:
        df = t.to_pandas().dropna(subset=["user_id"])
        ts = ts_us_series(df["ts"])
        return pa.table({"user_id": df["user_id"].to_numpy(np.int64),
                         "day": ts // day_us,
                         "ts_us": ts,
                         "event_id": df["event_id"].to_numpy(np.int64),
                         "event_type": df["event_type"].to_numpy()})

    ds = ds.map_batches(to_day, batch_format="pyarrow", zero_copy_batch=True)

    def locf(df: pd.DataFrame) -> pd.DataFrame:
        # last observation per (user, day): sort asc, keep last
        df = df.sort_values(["user_id", "day", "ts_us", "event_id"],
                            kind="mergesort")
        last = df.drop_duplicates(["user_id", "day"], keep="last")
        span = last.groupby("user_id", sort=False)["day"] \
            .agg(["min", "max"]).reset_index()
        lens = (span["max"] - span["min"] + 1).to_numpy(np.int64)
        users = np.repeat(span["user_id"].to_numpy(np.int64), lens)
        offs = np.concatenate([[0], np.cumsum(lens)[:-1]])
        days = (np.arange(lens.sum(), dtype=np.int64)
                - np.repeat(offs, lens)
                + np.repeat(span["min"].to_numpy(np.int64), lens))
        dense = pd.DataFrame({"user_id": users, "day": days})
        out = dense.merge(last[["user_id", "day", "event_type"]],
                          on=["user_id", "day"], how="left")
        # grouped forward fill: rows are (user, day)-ordered by construction
        # and every user's FIRST grid day has an observation (min over
        # observed days), so ffill never bleeds across users
        out["event_type"] = out["event_type"].ffill()
        return pd.DataFrame({
            "user_id": out["user_id"].to_numpy(np.int64),
            "day_us": out["day"].to_numpy(np.int64) * day_us,
            "last_type": out["event_type"].to_numpy()})

    return partitioned_map(ds, locf, key="user_id",
                           num_partitions=num_partitions)


def user_daily_locf_oracle_sql(day_us: int = 86_400_000_000) -> str:
    return f"""
        WITH d AS (SELECT user_id,
                          (epoch_us(ts) // {day_us}) AS day, event_type,
                          row_number() OVER (
                              PARTITION BY user_id, epoch_us(ts) // {day_us}
                              ORDER BY ts DESC, event_id DESC) AS rn
                   FROM events WHERE user_id IS NOT NULL),
        lastv AS (SELECT user_id, day, event_type FROM d WHERE rn = 1),
        span AS (SELECT user_id, min(day) AS lo, max(day) AS hi
                 FROM lastv GROUP BY user_id),
        dense AS (SELECT user_id, lo + i AS day
                  FROM span, UNNEST(generate_series(0, hi - lo)) AS t(i))
        SELECT dense.user_id, dense.day * {day_us} AS day_us,
               last_value(l.event_type IGNORE NULLS) OVER (
                   PARTITION BY dense.user_id ORDER BY dense.day
                   ROWS UNBOUNDED PRECEDING) AS last_type
        FROM dense LEFT JOIN lastv l
             ON l.user_id = dense.user_id AND l.day = dense.day"""


def order_percent_rank(sf_dir: str, num_partitions: int = 16):
    """PERCENT_RANK within group: each order's price percentile among its
    customer's orders — ``(rank − 1) / (n − 1)`` with min-rank tie sharing,
    exactly SQL's PERCENT_RANK.  One custkey-hash co-location, then a
    vectorized grouped rank (pandas ``rank(method="min")`` — C level);
    single-order customers get 0.0 (SQL: 0/0 window → 0)."""
    from ..stages.partition import partitioned_map

    ds = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])

    def pr(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("o_custkey")["o_totalprice"]
        rank = g.rank(method="min").to_numpy(np.float64)
        n = g.transform("size").to_numpy(np.float64)
        out = np.where(n > 1, (rank - 1) / (n - 1), 0.0)
        return pd.DataFrame({
            "o_orderkey": df["o_orderkey"].to_numpy(np.int64),
            "o_custkey": df["o_custkey"].to_numpy(np.int64),
            "pr": round_half_away(out, 6)})

    return partitioned_map(ds, pr, key="o_custkey",
                           num_partitions=num_partitions)


def order_percent_rank_oracle_sql() -> str:
    return """
        SELECT o_orderkey, o_custkey,
               round(percent_rank() OVER (
                   PARTITION BY o_custkey ORDER BY o_totalprice), 6) AS pr
        FROM orders"""


def _pq_rows(sf_dir: str, table: str) -> int:
    """Parquet-metadata row count — no scan, no Ray work.  Used to
    short-circuit ``Dataset.join`` plans on zero-row inputs (an empty read
    yields zero schema-less blocks, which a hash join cannot plan over)."""
    import pyarrow.parquet as _pq
    return _pq.read_metadata(f"{sf_dir}/{table}.parquet").num_rows


# --------------------------------------------------------------------------
# round-4 session-3: the remaining TPC-H join shapes expressible over the
# testdata's narrowed schemas (no partsupp / l_commitdate / l_shipmode /
# c_phone — each query keeps its canonical SHAPE with a deterministic
# adaptation the oracle derives identically).


def q4_order_priority(sf_dir: str, date_lo: str = "1995-04-01",
                      date_hi: str = "1995-07-01", num_partitions: int = 16):
    """TPC-H Q4 shape: EXISTS semijoin — count orders per priority that have
    at least one problem line (adapted: ``l_returnflag = 'R'`` stands in for
    the missing ``l_commitdate < l_receiptdate``).

    Scale shape: the EXISTS side reduces to DISTINCT problem orderkeys
    (per-batch unique → one keyed co-location — int64s only, never fact
    rows), then ONE hash join against the date-windowed orders stream; the
    priority count is a per-batch partial → |priorities|-row groupby."""
    empty_q4 = pd.DataFrame({"o_orderpriority": pd.Series([], dtype=str),
                             "order_count": pd.Series([], dtype=np.int64)})
    if _pq_rows(sf_dir, "orders") == 0 or _pq_rows(sf_dir, "lineitem") == 0:
        return empty_q4
    def distinct_keys(t: pa.Table) -> pa.Table:
        mask = pc.equal(t["l_returnflag"], "R")
        ids = pd.unique(t.filter(mask)["l_orderkey"].to_pandas())
        return pa.table({"l_orderkey": pa.array(ids.astype(np.int64))})

    problem = _read(sf_dir, "lineitem", ["l_orderkey", "l_returnflag"]) \
        .map_batches(distinct_keys, batch_format="pyarrow", zero_copy_batch=True)
    problem = add_partition_column(problem, key="l_orderkey",
                                   num_partitions=num_partitions)

    def uniq(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"l_orderkey":
                             pd.unique(df["l_orderkey"]).astype(np.int64)})

    problem = problem.groupby("part").map_groups(uniq, batch_format="pandas")

    lo, hi = pd.Timestamp(date_lo), pd.Timestamp(date_hi)

    def window(t: pa.Table) -> pa.Table:
        m = pc.and_(pc.greater_equal(t["o_orderdate"], pa.scalar(lo)),
                    pc.less(t["o_orderdate"], pa.scalar(hi)))
        return t.filter(m).select(["o_orderkey", "o_orderpriority"])

    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_orderdate", "o_orderpriority"]) \
        .map_batches(window, batch_format="pyarrow", zero_copy_batch=True)

    joined = orders.join(problem, join_type="inner",
                         num_partitions=num_partitions,
                         on=("o_orderkey",), right_on=("l_orderkey",))

    def partial(t: pa.Table) -> pa.Table:
        g = t["o_orderpriority"].to_pandas().value_counts()
        return pa.table({"o_orderpriority": g.index.astype(str),
                         "partial_n": g.to_numpy().astype(np.int64)})

    # |priorities| is 5 at any SF: bounded-domain driver merge
    out = _merge_bounded_partials(
        joined.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True),
        ["o_orderpriority"], {"partial_n": "order_count"})
    if out is None:
        return empty_q4
    return out.sort_values("o_orderpriority").reset_index(drop=True)


def q4_oracle_sql(date_lo: str = "1995-04-01",
                  date_hi: str = "1995-07-01") -> str:
    return f"""
        SELECT o_orderpriority, count(*) AS order_count
        FROM orders o
        WHERE o.o_orderdate >= TIMESTAMP '{date_lo}'
          AND o.o_orderdate <  TIMESTAMP '{date_hi}'
          AND EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_orderkey = o.o_orderkey
                        AND l.l_returnflag = 'R')
        GROUP BY o_orderpriority"""


def q8_market_share(sf_dir: str, broadcast_threshold: int = 5_000_000,
                    num_partitions: int = 16):
    """TPC-H Q8 shape: national market share — the target nation's fraction
    of total revenue per order-year, restricted to one part type and one
    customer region.  Constants are DERIVED deterministically (region of
    ``r_regionkey = 0``; the smallest supplier-bearing nation in it;
    ``p_type`` of ``p_partkey = 1``) so every scale factor is non-degenerate.

    Topology: three computed dimensions (type-filtered partkeys,
    suppkey→is-target-nation, region-filtered custkeys) prune BOTH fact
    scans before the single orders⋈lineitem hash join; the aggregate ships
    |years|×2 partial rows.  EACH dimension is independently SIZE-GUARDED
    on its parquet-metadata row count: under ``broadcast_threshold`` it
    broadcasts once via ``ray.put``; above it the part filter and the
    customer region probe become shared tag-union hash semijoins
    (:func:`_shuffle_semijoin`) and the supplier flag becomes a LEFT
    lookup of the (|suppliers|/|nations|-sized) target-nation supplier set
    with a False default (:func:`_shuffle_attach`) — same downstream
    either way (oracle-tested on both sides of the threshold).  The
    target-nation / target-type constants derive from a distributed
    distinct and a predicate-pushed single-row probe, never a driver read
    of the full table."""
    empty_q8 = pd.DataFrame({"o_year": pd.Series([], dtype=np.int64),
                             "mkt_share": pd.Series([], dtype=float)})
    if _pq_rows(sf_dir, "orders") == 0 or _pq_rows(sf_dir, "lineitem") == 0:
        return empty_q8
    nat = _read_small_pd(sf_dir, "nation", ["n_nationkey", "n_regionkey"])
    region_nations = np.sort(nat[nat["n_regionkey"] == 0]["n_nationkey"]
                             .to_numpy(np.int64))
    n_sup = _dim_rows(sf_dir, "supplier")
    n_part = _dim_rows(sf_dir, "part")
    n_cust = _dim_rows(sf_dir, "customer")

    # target nation: |nations|-bounded distributed distinct of supplier
    # nations, intersected with the region on the driver
    def s_nk(t: pa.Table) -> pa.Table:
        v = np.unique(t["s_nationkey"].to_numpy(zero_copy_only=False)
                      .astype(np.int64))
        return pa.table({"nk": pa.array(v)})

    got = _read(sf_dir, "supplier", ["s_nationkey"]) \
        .map_batches(s_nk, batch_format="pyarrow", zero_copy_batch=True) \
        .to_pandas()
    sup_nations = (np.unique(got["nk"].to_numpy(np.int64))
                   if len(got) and "nk" in got.columns
                   else np.array([], np.int64))
    cand = np.intersect1d(sup_nations, region_nations)
    target_nation = int(cand.min()) if len(cand) else -1

    # target type: single-row probe, predicate pushed into the part scan
    row1 = ray.data.read_parquet(
        f"{sf_dir}/part.parquet", columns=["p_type"],
        filter=pc.equal(pc.field("p_partkey"), 1)).to_pandas()
    target_type = row1["p_type"].iloc[0] \
        if len(row1) and "p_type" in row1.columns else ""

    # ---- orders side: region-customer semijoin → (o_orderkey, o_year) ----
    orders_raw = _read(sf_dir, "orders",
                       ["o_orderkey", "o_custkey", "o_orderdate"])
    if n_cust <= broadcast_threshold:
        cust = _read_small_pd(sf_dir, "customer", ["c_custkey", "c_nationkey"])
        ckeys = np.sort(cust[cust["c_nationkey"].isin(region_nations)]
                        ["c_custkey"].to_numpy(np.int64))
        ck_ref = ray.put(ckeys)

        def orders_side(t: pa.Table) -> pa.Table:
            ck = ray.get(ck_ref)
            df = t.to_pandas()
            df = df[np.isin(df["o_custkey"].to_numpy(np.int64), ck)]
            return pa.table({
                "o_orderkey": pa.array(df["o_orderkey"].to_numpy(np.int64)),
                "o_year": pa.array(df["o_orderdate"].dt.year
                                   .to_numpy(np.int64))})

        orders = orders_raw.map_batches(orders_side, batch_format="pyarrow",
                                        zero_copy_batch=True)
    else:
        rn = region_nations  # ≤|nations| values: plain closure capture

        def cust_side(t: pa.Table) -> pa.Table:
            v = t["c_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
            return pa.table(
                {"c_custkey": t["c_custkey"].filter(pa.array(np.isin(v, rn)))})

        cust_ds = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"]) \
            .map_batches(cust_side, batch_format="pyarrow",
                         zero_copy_batch=True)
        sj = _shuffle_semijoin(
            orders_raw, "o_custkey",
            [("o_orderkey", pa.int64()), ("o_orderdate", pa.timestamp("us"))],
            cust_ds, "c_custkey", num_partitions=num_partitions)

        def to_year(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {"o_orderkey": df["o_orderkey"].to_numpy(np.int64),
                 "o_year": df["o_orderdate"].dt.year.to_numpy(np.int64)})

        orders = sj.map_batches(to_year, batch_format="pandas")

    # ---- lineitem side: volume → part-type filter → supplier flag ----
    li_raw = _read(sf_dir, "lineitem",
                   ["l_orderkey", "l_partkey", "l_suppkey",
                    "l_extendedprice", "l_discount"])
    if n_part <= broadcast_threshold:
        part_pd = _read_small_pd(sf_dir, "part", ["p_partkey", "p_type"])
        pkeys = np.sort(part_pd[part_pd["p_type"] == target_type]
                        ["p_partkey"].to_numpy(np.int64))
        pk_ref = ray.put(pkeys)

        def li_pf(t: pa.Table) -> pa.Table:
            pk = ray.get(pk_ref)
            df = t.to_pandas()
            df = df[np.isin(df["l_partkey"].to_numpy(np.int64), pk)]
            rev = (df["l_extendedprice"] * (1 - df["l_discount"])).to_numpy()
            return pa.table({
                "l_orderkey": pa.array(df["l_orderkey"].to_numpy(np.int64)),
                "l_suppkey": pa.array(df["l_suppkey"].to_numpy(np.int64)),
                "volume": pa.array(rev)})

        li1 = li_raw.map_batches(li_pf, batch_format="pyarrow",
                                 zero_copy_batch=True)
    else:
        tt = target_type

        def part_side(t: pa.Table) -> pa.Table:
            m = pc.equal(t["p_type"], tt)
            return pa.table({"p_partkey": t["p_partkey"].filter(m)})

        part_ds = _read(sf_dir, "part", ["p_partkey", "p_type"]) \
            .map_batches(part_side, batch_format="pyarrow",
                         zero_copy_batch=True)

        def li_vol(t: pa.Table) -> pa.Table:
            df = t.to_pandas()
            rev = (df["l_extendedprice"] * (1 - df["l_discount"])).to_numpy()
            return pa.table({
                "l_partkey": pa.array(df["l_partkey"].to_numpy(np.int64)),
                "l_orderkey": pa.array(df["l_orderkey"].to_numpy(np.int64)),
                "l_suppkey": pa.array(df["l_suppkey"].to_numpy(np.int64)),
                "volume": pa.array(rev)})

        li1 = _shuffle_semijoin(
            li_raw.map_batches(li_vol, batch_format="pyarrow",
                               zero_copy_batch=True),
            "l_partkey",
            [("l_orderkey", pa.int64()), ("l_suppkey", pa.int64()),
             ("volume", pa.float64())],
            part_ds, "p_partkey", num_partitions=num_partitions)

    if n_sup <= broadcast_threshold:
        sup = _read_small_pd(sf_dir, "supplier",
                             ["s_suppkey", "s_nationkey"]) \
            .sort_values("s_suppkey")
        skeys = sup["s_suppkey"].to_numpy(np.int64)
        s_is_target = (sup["s_nationkey"].to_numpy(np.int64) == target_nation)
        sk_ref = ray.put((skeys, s_is_target))

        def flag_pd(df: pd.DataFrame) -> pd.DataFrame:
            sk_arr, s_flag = ray.get(sk_ref)
            sk = df["l_suppkey"].to_numpy(np.int64)
            if len(sk_arr):
                pos = np.searchsorted(sk_arr, sk).clip(max=len(sk_arr) - 1)
                tgt = (sk_arr[pos] == sk) & s_flag[pos]
            else:
                tgt = np.zeros(len(sk), dtype=bool)
            return pd.DataFrame(
                {"l_orderkey": df["l_orderkey"].to_numpy(np.int64),
                 "is_target": tgt,
                 "volume": df["volume"].to_numpy(np.float64)})

        li = li1.map_batches(flag_pd, batch_format="pandas")
    else:
        tn = target_nation

        def tgt_sup(t: pa.Table) -> pa.Table:
            m = pc.equal(t["s_nationkey"], tn)
            keys = t["s_suppkey"].filter(m)
            return pa.table({"s_suppkey": keys,
                             "flag": pa.array(np.ones(len(keys), bool))})

        sup_ds = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]) \
            .map_batches(tgt_sup, batch_format="pyarrow",
                         zero_copy_batch=True)
        attached = _shuffle_attach(
            li1, "l_suppkey",
            [("l_orderkey", pa.int64()), ("volume", pa.float64())],
            sup_ds, "s_suppkey", "flag", "is_target",
            val_type=pa.bool_(), how="left", default=False,
            num_partitions=num_partitions)

        def to_bool(df: pd.DataFrame) -> pd.DataFrame:
            df = df.copy()
            df["is_target"] = df["is_target"].astype(bool)
            return df[["l_orderkey", "is_target", "volume"]]

        li = attached.map_batches(to_bool, batch_format="pandas")

    joined = li.join(orders, join_type="inner", num_partitions=num_partitions,
                     on=("l_orderkey",), right_on=("o_orderkey",))

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        g = df.groupby(["o_year", "is_target"], sort=False)["volume"] \
            .sum().reset_index(name="partial_vol")
        return pa.Table.from_pandas(g, preserve_index=False)

    # year × bool domain is ≤ 2×|years|: bounded-domain driver merge
    agg = _merge_bounded_partials(
        joined.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True),
        ["o_year", "is_target"], {"partial_vol": "vol"})
    if agg is None:
        return pd.DataFrame({"o_year": pd.Series([], dtype=np.int64),
                             "mkt_share": pd.Series([], dtype=float)})
    tot = agg.groupby("o_year")["vol"].sum()
    tgt = agg[agg["is_target"]].set_index("o_year")["vol"] \
        .reindex(tot.index, fill_value=0.0)
    out = pd.DataFrame({"o_year": tot.index.to_numpy(np.int64),
                        "mkt_share": round_half_away(
                            (tgt / tot).to_numpy(np.float64), 6)})
    return out.sort_values("o_year").reset_index(drop=True)


def q8_oracle_sql() -> str:
    return """
        WITH region_nations AS (
            SELECT n_nationkey FROM nation WHERE n_regionkey = 0),
        target AS (
            SELECT min(n_nationkey) AS nk FROM region_nations
            WHERE n_nationkey IN (SELECT DISTINCT s_nationkey FROM supplier)),
        ttype AS (SELECT p_type FROM part WHERE p_partkey = 1),
        vols AS (
            SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
                   l.l_extendedprice * (1 - l.l_discount) AS volume,
                   CASE WHEN s.s_nationkey = (SELECT nk FROM target)
                        THEN l.l_extendedprice * (1 - l.l_discount)
                        ELSE 0 END AS tvolume
            FROM lineitem l
            JOIN part p ON p.p_partkey = l.l_partkey
                       AND p.p_type = (SELECT p_type FROM ttype)
            JOIN supplier s ON s.s_suppkey = l.l_suppkey
            JOIN orders o ON o.o_orderkey = l.l_orderkey
            JOIN customer c ON c.c_custkey = o.o_custkey
            WHERE c.c_nationkey IN (SELECT n_nationkey FROM region_nations))
        SELECT o_year, round(sum(tvolume) / sum(volume), 6) AS mkt_share
        FROM vols GROUP BY o_year"""


def q13_custdist(sf_dir: str, num_partitions: int = 16):
    """TPC-H Q13 shape: customer order-count DISTRIBUTION (left outer join →
    count per customer including zeros → count of counts), excluding
    '1-URGENT' orders (stand-in for the missing ``o_comment NOT LIKE``).

    The LEFT OUTER JOIN is expressed join-free: the orders side emits
    per-batch partial counts per custkey, the customer side emits (custkey,
    0) rows, and ONE keyed sum produces every customer's count — zero-order
    customers surface as sum 0.  Narrow int64s shuffle; never rows.  The
    distribution merge stays on the driver: its domain is |distinct
    per-customer order counts| — naturally bounded by the max orders per
    customer (~tens at any SF), NOT by row count — so the per-block
    partials total O(domain × blocks) tiny rows and a second AllToAll
    would be pure fixed cost (the bounded-group-domain pattern of
    order_priority_rollup)."""
    def o_partial(t: pa.Table) -> pa.Table:
        m = pc.invert(pc.equal(t["o_orderpriority"], "1-URGENT"))
        g = t.filter(m)["o_custkey"].to_pandas().value_counts()
        return pa.table({"c_custkey": g.index.to_numpy(np.int64),
                         "partial_n": g.to_numpy().astype(np.int64)})

    def c_zero(t: pa.Table) -> pa.Table:
        ids = t["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"c_custkey": pa.array(ids),
                         "partial_n": pa.array(np.zeros(len(ids), np.int64))})

    od = _read(sf_dir, "orders", ["o_custkey", "o_orderpriority"]) \
        .map_batches(o_partial, batch_format="pyarrow", zero_copy_batch=True)
    cd = _read(sf_dir, "customer", ["c_custkey"]) \
        .map_batches(c_zero, batch_format="pyarrow", zero_copy_batch=True)

    per_cust = od.union(cd).groupby("c_custkey") \
        .aggregate(Sum("partial_n", alias_name="c_count"))

    def dist_partial(t: pa.Table) -> pa.Table:
        g = t["c_count"].to_pandas().value_counts()
        return pa.table({"c_count": g.index.to_numpy(np.int64),
                         "partial_d": g.to_numpy().astype(np.int64)})

    parts = per_cust.map_batches(dist_partial, batch_format="pyarrow",
                                 zero_copy_batch=True).to_pandas()
    if not len(parts.columns) or not len(parts):
        return pd.DataFrame({"c_count": pd.Series([], dtype=np.int64),
                             "custdist": pd.Series([], dtype=np.int64)})
    out = parts.groupby("c_count", sort=False, as_index=False)["partial_d"] \
        .sum().rename(columns={"partial_d": "custdist"})
    return out.sort_values(["custdist", "c_count"],
                           ascending=[False, False]).reset_index(drop=True)


def q13_oracle_sql() -> str:
    return """
        SELECT c_count, count(*) AS custdist
        FROM (SELECT c.c_custkey, count(o.o_orderkey) AS c_count
              FROM customer c
              LEFT JOIN orders o ON o.o_custkey = c.c_custkey
                                AND o.o_orderpriority <> '1-URGENT'
              GROUP BY c.c_custkey)
        GROUP BY c_count"""


def _probe_rows(sf_dir: str, table: str, key_col: str,
                cols: list[str], keys: np.ndarray) -> pd.DataFrame:
    """Distributed point lookup: scan ``table`` (column-pruned) and keep
    only rows whose ``key_col`` is in the (small, broadcast) ``keys`` set —
    the decoration path for argmax/top-k winners, so the dimension table
    never lands on the driver whole.  O(|keys|) result rows."""
    keys = np.sort(np.unique(np.asarray(keys, dtype=np.int64)))
    ref = ray.put(keys)

    def pick(t: pa.Table) -> pa.Table:
        ks = ray.get(ref)
        v = t[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(ks) == 0:
            return t.slice(0, 0)
        pos = np.searchsorted(ks, v).clip(max=len(ks) - 1)
        return t.filter(pa.array(ks[pos] == v))

    out = _read(sf_dir, table, cols) \
        .map_batches(pick, batch_format="pyarrow", zero_copy_batch=True) \
        .to_pandas()
    if len(out) == 0 and not all(c in out.columns for c in cols):
        # zero-block result drops its schema: rebuild the typed empty frame
        import pyarrow.parquet as _pq
        out = _pq.read_schema(f"{sf_dir}/{table}.parquet").empty_table() \
            .select(cols).to_pandas()
    return out


def q15_top_supplier(sf_dir: str, date_lo: str = "1996-01-01",
                     date_hi: str = "1996-04-01"):
    """TPC-H Q15 shape: ARGMAX WITH TIES over an aggregated view — the
    supplier(s) whose windowed revenue equals the global maximum.

    Scale shape: the per-supplier revenue view stays a Dataset after its
    groupby; a per-block candidate pass keeps each block's max-revenue
    rows (ties included), so the driver sees O(blocks × ties) rows — never
    the |suppliers|-row view itself — and re-filters the global max.
    Winner names come from a DISTRIBUTED point lookup of the supplier
    table (:func:`_probe_rows`), not a whole-table driver read."""
    lo, hi = pd.Timestamp(date_lo), pd.Timestamp(date_hi)

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(pc.greater_equal(t["l_shipdate"], pa.scalar(lo)),
                             pc.less(t["l_shipdate"], pa.scalar(hi))))
        df = t.to_pandas()
        rev = df["l_extendedprice"] * (1 - df["l_discount"])
        g = rev.groupby(df["l_suppkey"]).sum().reset_index()
        g.columns = ["s_suppkey", "partial_rev"]
        return pa.Table.from_pandas(g, preserve_index=False)

    view = _read(sf_dir, "lineitem",
                 ["l_suppkey", "l_shipdate", "l_extendedprice",
                  "l_discount"]) \
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True) \
        .groupby("s_suppkey") \
        .aggregate(Sum("partial_rev", alias_name="total_revenue"))

    def block_best(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return df
        df = df.copy()
        df["total_revenue"] = round_half_away(
            df["total_revenue"].to_numpy(np.float64), 2)
        return df[df["total_revenue"] == df["total_revenue"].max()]

    cand = view.map_batches(block_best, batch_format="pandas").to_pandas()
    if not len(cand) or "total_revenue" not in cand.columns:
        return pd.DataFrame({"s_suppkey": pd.Series([], dtype=np.int64),
                             "s_name": pd.Series([], dtype=str),
                             "total_revenue": pd.Series([], dtype=float)})
    best = cand[cand["total_revenue"] == cand["total_revenue"].max()]
    names = _probe_rows(sf_dir, "supplier", "s_suppkey",
                        ["s_suppkey", "s_name"],
                        best["s_suppkey"].to_numpy(np.int64))
    out = best.merge(names, on="s_suppkey", how="left")
    return out[["s_suppkey", "s_name", "total_revenue"]] \
        .sort_values("s_suppkey").reset_index(drop=True)


def q15_oracle_sql(date_lo: str = "1996-01-01",
                   date_hi: str = "1996-04-01") -> str:
    return f"""
        WITH revenue AS (
            SELECT l_suppkey AS s_suppkey,
                   round(sum(l_extendedprice * (1 - l_discount)), 2)
                       AS total_revenue
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '{date_lo}'
              AND l_shipdate <  TIMESTAMP '{date_hi}'
            GROUP BY l_suppkey)
        SELECT r.s_suppkey, s.s_name, r.total_revenue
        FROM revenue r JOIN supplier s ON s.s_suppkey = r.s_suppkey
        WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)"""


def q21_waiting_suppliers(sf_dir: str, k: int = 20,
                          num_partitions: int = 16):
    """TPC-H Q21 shape: correlated EXISTS + NOT EXISTS on the SAME fact
    table — suppliers who were the SOLE problem supplier on a multi-supplier
    completed order (adapted: problem line = ``l_returnflag = 'R'``; order
    completed = ``o_orderstatus = 'F'``).

    Scale shape: lineitem reduces per batch to distinct (orderkey, suppkey,
    had-problem) triples; ONE hash join against the F-status orderkeys
    prunes to completed orders; then one keyed co-location per orderkey
    evaluates the per-order EXISTS/NOT-EXISTS set logic vectorized, and the
    per-supplier wait count is a |suppliers|-bounded groupby + top-k."""
    empty_q21 = pd.DataFrame({"s_name": pd.Series([], dtype=str),
                              "numwait": pd.Series([], dtype=np.int64)})
    if _pq_rows(sf_dir, "orders") == 0 or _pq_rows(sf_dir, "lineitem") == 0:
        return empty_q21
    def triples(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "l_orderkey": t["l_orderkey"].to_numpy(zero_copy_only=False),
            "l_suppkey": t["l_suppkey"].to_numpy(zero_copy_only=False),
            "prob": pc.equal(t["l_returnflag"], "R").to_numpy(
                zero_copy_only=False)})
        g = df.groupby(["l_orderkey", "l_suppkey"], sort=False)["prob"] \
            .max().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_suppkey", "l_returnflag"]) \
        .map_batches(triples, batch_format="pyarrow", zero_copy_batch=True)

    def f_orders(t: pa.Table) -> pa.Table:
        return t.filter(pc.equal(t["o_orderstatus"], "F")) \
            .select(["o_orderkey"])

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderstatus"]) \
        .map_batches(f_orders, batch_format="pyarrow", zero_copy_batch=True)

    joined = li.join(orders, join_type="inner", num_partitions=num_partitions,
                     on=("l_orderkey",), right_on=("o_orderkey",))

    def per_order(df: pd.DataFrame) -> pd.DataFrame:
        # re-dedup (orderkey, suppkey) across batch partials, then the Q21
        # set logic per order: ≥2 suppliers, exactly one with a problem
        g = df.groupby(["l_orderkey", "l_suppkey"], sort=False)["prob"] \
            .max().reset_index()
        st = g.groupby("l_orderkey", sort=False).agg(
            n_supp=("l_suppkey", "size"), n_prob=("prob", "sum"))
        ok = st[(st["n_supp"] >= 2) & (st["n_prob"] == 1)].index
        hits = g[g["prob"] & g["l_orderkey"].isin(ok)]
        cnt = hits.groupby("l_suppkey", sort=False).size()
        return pd.DataFrame({"s_suppkey": cnt.index.to_numpy(np.int64),
                             "partial_w": cnt.to_numpy().astype(np.int64)})

    waits = partitioned_map(joined, per_order, key="l_orderkey",
                            num_partitions=num_partitions) \
        .groupby("s_suppkey") \
        .aggregate(Sum("partial_w", alias_name="numwait"))

    def block_topk(df: pd.DataFrame) -> pd.DataFrame:
        # keep every row tied-or-above the block's k-th largest numwait: a
        # global top-k row (numwait desc, name asc) either clears its
        # block's cutoff or is beaten by >= k STRICTLY-greater rows that
        # also beat it globally — so the candidate union is exact under
        # any tiebreak, and the driver sees O(blocks x (k + boundary
        # ties)) rows instead of |suppliers|
        if len(df) <= k:
            return df
        cut = df["numwait"].nlargest(k).min()
        return df[df["numwait"] >= cut]

    cand = waits.map_batches(block_topk, batch_format="pandas").to_pandas()
    if not len(cand) or "numwait" not in cand.columns:
        return pd.DataFrame({"s_name": pd.Series([], dtype=str),
                             "numwait": pd.Series([], dtype=np.int64)})
    names = _probe_rows(sf_dir, "supplier", "s_suppkey",
                        ["s_suppkey", "s_name"],
                        cand["s_suppkey"].to_numpy(np.int64))
    out = cand.merge(names, on="s_suppkey", how="left")
    out = out.sort_values(["numwait", "s_name"], ascending=[False, True],
                          kind="mergesort").head(k)
    return out[["s_name", "numwait"]].reset_index(drop=True)


def q21_oracle_sql(k: int = 20) -> str:
    return f"""
        WITH triples AS (
            SELECT l_orderkey, l_suppkey,
                   max(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS prob
            FROM lineitem
            JOIN orders ON o_orderkey = l_orderkey AND o_orderstatus = 'F'
            GROUP BY l_orderkey, l_suppkey),
        stats AS (
            SELECT l_orderkey, count(*) AS n_supp, sum(prob) AS n_prob
            FROM triples GROUP BY l_orderkey)
        SELECT s.s_name, count(*) AS numwait
        FROM triples t
        JOIN stats st ON st.l_orderkey = t.l_orderkey
                     AND st.n_supp >= 2 AND st.n_prob = 1
        JOIN supplier s ON s.s_suppkey = t.l_suppkey
        WHERE t.prob = 1
        GROUP BY s.s_name
        ORDER BY numwait DESC, s.s_name ASC
        LIMIT {k}"""


def q22_global_sales(sf_dir: str, recency_cutoff: str = "2000-01-01",
                     num_partitions: int = 16):
    """TPC-H Q22 shape: anti join + GLOBAL SCALAR subquery — LAPSED
    customers from the odd-numbered nations (stand-in for the missing phone
    country codes) with above-average positive balance and NO orders since
    ``recency_cutoff`` (the synthetic orders table covers every customer,
    so the canonical no-orders-ever predicate is vacuous at every sf; the
    dated variant keeps the NOT EXISTS semantics non-degenerate).

    The scalar average is ONE tiny aggregate over the pruned customer read;
    the NOT EXISTS is the union-side trick (orders emit distinct custkeys
    side=1, candidate customers side=0 with their acctbal) → one keyed
    co-location keeps custkeys whose group has no order row — int64 +
    float columns shuffle, never wide rows."""
    def cand(t: pa.Table) -> pa.Table:
        nk = t["c_nationkey"].to_numpy(zero_copy_only=False)
        bal = t["c_acctbal"].to_numpy(zero_copy_only=False)
        m = (nk % 2 == 1) & (bal > 0.0)
        g = pd.DataFrame({"n": np.where(m, 1, 0),
                          "s": np.where(m, bal, 0.0)}).sum()
        return pa.table({"partial_n": pa.array([int(g["n"])]),
                         "partial_s": pa.array([float(g["s"])])})

    cust_cols = ["c_custkey", "c_nationkey", "c_acctbal"]
    stats = _read(sf_dir, "customer", cust_cols) \
        .map_batches(cand, batch_format="pyarrow", zero_copy_batch=True) \
        .aggregate(Sum("partial_n", alias_name="n"),
                   Sum("partial_s", alias_name="s")) or {}
    n, s = int(stats.get("n") or 0), float(stats.get("s") or 0.0)
    avg_bal = s / n if n else np.inf  # empty candidate set → nothing passes

    def c_side(t: pa.Table) -> pa.Table:
        nk = t["c_nationkey"].to_numpy(zero_copy_only=False)
        bal = t["c_acctbal"].to_numpy(zero_copy_only=False)
        m = (nk % 2 == 1) & (bal > avg_bal)
        df = pd.DataFrame({"c_custkey": t["c_custkey"]
                           .to_numpy(zero_copy_only=False)[m],
                           "c_nationkey": nk[m], "c_acctbal": bal[m]})
        df["side"] = np.int8(0)
        return pa.Table.from_pandas(df, preserve_index=False)

    def o_side(t: pa.Table) -> pa.Table:
        ids = pd.unique(t["o_custkey"].to_pandas().dropna())
        return pa.table({
            "c_custkey": pa.array(ids.astype(np.int64)),
            "c_nationkey": pa.array(np.zeros(len(ids), np.int64)),
            "c_acctbal": pa.array(np.zeros(len(ids), np.float64)),
            "side": pa.array(np.ones(len(ids), np.int8))})

    cd = _read(sf_dir, "customer", cust_cols) \
        .map_batches(c_side, batch_format="pyarrow", zero_copy_batch=True)
    # recency predicate pushed into the orders scan (row-group pruning)
    od = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey"],
        filter=pc.field("o_orderdate") >= np.datetime64(recency_cutoff, "us")) \
        .map_batches(o_side, batch_format="pyarrow", zero_copy_batch=True)

    def anti(df: pd.DataFrame) -> pd.DataFrame:
        has_order = df.groupby("c_custkey")["side"].max()
        keep = has_order.index[has_order == 0]
        df = df[(df["side"] == 0) & df["c_custkey"].isin(keep)]
        g = df.groupby("c_nationkey").agg(
            partial_cnt=("c_custkey", "size"),
            partial_bal=("c_acctbal", "sum")).reset_index()
        return g

    # |nations|-bounded final over the anti-join partials: streamed driver
    # fold instead of a second AllToAll after the anti-join shuffle
    out = _merge_bounded_partials(
        partitioned_map(cd.union(od), anti, key="c_custkey",
                        num_partitions=num_partitions),
        keys=["c_nationkey"],
        sums={"partial_cnt": "numcust", "partial_bal": "totacctbal"})
    if out is None:
        return pd.DataFrame({"c_nationkey": pd.Series([], dtype=np.int64),
                             "numcust": pd.Series([], dtype=np.int64),
                             "totacctbal": pd.Series([], dtype=float)})
    out["totacctbal"] = round_half_away(out["totacctbal"], 2)
    return out.sort_values("c_nationkey").reset_index(drop=True)


def q22_oracle_sql(recency_cutoff: str = "2000-01-01") -> str:
    cut = recency_cutoff
    return f"""
        SELECT c_nationkey, count(*) AS numcust,
               round(sum(c_acctbal), 2) AS totacctbal
        FROM customer c
        WHERE c_nationkey % 2 = 1
          AND c_acctbal > (SELECT avg(c_acctbal) FROM customer
                           WHERE c_nationkey % 2 = 1 AND c_acctbal > 0)
          AND NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_orderdate >= TIMESTAMP '{cut}')
        GROUP BY c_nationkey"""


def latest_user_event(sf_dir: str, num_partitions: int = 16):
    """Materialized UPSERT view (CDC "latest row per key wins"): each user's
    most recent event, ties broken by largest event_id — the argmax-per-key
    shape that compacts a changelog into current state.

    Join-free two-level reduce: each batch keeps only its own per-user best
    row (argmax partial — a batch contributes ≤ |its users| rows), then ONE
    keyed co-location picks the global best per user.  The shuffle moves at
    most one narrow row per (user, batch); the events stream itself never
    re-sorts."""
    def batch_best(df: pd.DataFrame) -> pd.DataFrame:
        df = df.dropna(subset=["user_id"])
        if not len(df):
            return pd.DataFrame({
                "user_id": pd.Series([], dtype=np.int64),
                "event_id": pd.Series([], dtype=np.int64),
                "ts": pd.Series([], dtype="datetime64[us]"),
                "event_type": pd.Series([], dtype=str),
                "value": pd.Series([], dtype=float)})
        df = df.sort_values(["user_id", "ts", "event_id"],
                            kind="mergesort")
        best = df.groupby("user_id", sort=False).tail(1)
        return pd.DataFrame({
            "user_id": best["user_id"].to_numpy(np.int64),
            "event_id": best["event_id"].to_numpy(np.int64),
            "ts": best["ts"].to_numpy("datetime64[us]"),
            "event_type": best["event_type"].astype(str).to_numpy(),
            "value": best["value"].to_numpy(np.float64)})

    partials = _read(sf_dir, "events",
                     ["event_id", "user_id", "ts", "event_type", "value"]) \
        .map_batches(batch_best, batch_format="pandas", batch_size=8192)
    return partitioned_map(partials, batch_best, key="user_id",
                           num_partitions=num_partitions)


def latest_user_event_oracle_sql() -> str:
    return """
        SELECT user_id, event_id, ts, event_type, value
        FROM events
        WHERE user_id IS NOT NULL
        QUALIFY row_number() OVER (PARTITION BY user_id
                                   ORDER BY ts DESC, event_id DESC) = 1"""


def order_price_ntile(sf_dir: str, n: int = 4, num_buckets: int = 16):
    """Global NTILE(n): every order assigned its n-quantile bucket in the
    total ``(o_totalprice, o_orderkey)`` order — composed from the
    distributed prefix-count global rank (no global sort operator), then a
    vectorized rank→tile map with DuckDB's NTILE fill rule (the first
    ``N % n`` tiles get ``⌈N/n⌉`` rows).

    The value order reuses :func:`orders_global_rank`'s bucket machinery
    over the PRICE domain: per-price counts roll up distributed, cut
    points come from the cumulative counts, each bucket enumerates at its
    exclusive-scan offset."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
    n_rows = int(ds.count())
    if n_rows == 0:
        return pd.DataFrame({"o_orderkey": pd.Series([], dtype=np.int64),
                             "tile": pd.Series([], dtype=np.int64)})

    def price_counts(t: pa.Table) -> pa.Table:
        vc = t["o_totalprice"].to_pandas().value_counts()
        return pa.table({"price": pa.array(vc.index.to_numpy(np.float64)),
                         "cnt": pa.array(vc.to_numpy(np.int64))})

    counts = ds.map_batches(price_counts, batch_format="pyarrow",
                            zero_copy_batch=True) \
        .groupby("price").aggregate(Sum("cnt", alias_name="n")).to_pandas() \
        .sort_values("price").reset_index(drop=True)
    cum = counts["n"].cumsum().to_numpy(np.int64)
    prices = counts["price"].to_numpy(np.float64)
    # num_buckets-1 cut prices; a bucket = a contiguous price range.
    # offsets[b] = rows with price <= cut b-1 (exclusive-scan start of
    # bucket b in the global value order)
    targets = (np.arange(1, num_buckets) * n_rows) // num_buckets
    cut_idx = np.clip(np.searchsorted(cum, targets, side="left"),
                      0, len(counts) - 1)
    ucuts = np.unique(prices[cut_idx])
    offsets = np.concatenate(
        [[0], cum[np.searchsorted(prices, ucuts, side="left")]])
    cuts_ref = ray.put((ucuts, offsets))

    # DuckDB NTILE fill: first (N % n) tiles take ceil(N/n), rest floor
    base, extra = divmod(n_rows, n)
    bounds = np.cumsum(np.array([base + 1] * extra + [base] * (n - extra),
                                dtype=np.int64))
    bounds_ref = ray.put(bounds)

    def bucketize(t: pa.Table) -> pa.Table:
        cts, _ = ray.get(cuts_ref)
        p = t["o_totalprice"].to_numpy(zero_copy_only=False)
        # side='left': a cut price's own rows stay in the LOWER bucket,
        # matching offsets[b] = rows <= cut b-1
        b = np.searchsorted(cts, p, side="left")
        return pa.table({"o_orderkey": t["o_orderkey"],
                         "o_totalprice": t["o_totalprice"],
                         "bucket": pa.array(b.astype(np.int32))})

    bucketed = ds.map_batches(bucketize, batch_format="pyarrow",
                              zero_copy_batch=True)

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        # offsets[b] (rows in strictly-lower buckets) anchors this bucket's
        # local enumeration in the exact global order
        _, offs = ray.get(cuts_ref)
        bounds_ = ray.get(bounds_ref)
        b = int(df["bucket"].iloc[0])
        df = df.sort_values(["o_totalprice", "o_orderkey"], kind="mergesort")
        start = offs[b]
        rank = start + np.arange(len(df), dtype=np.int64)  # 0-based
        tile = np.searchsorted(bounds_, rank, side="right") + 1
        return pd.DataFrame({"o_orderkey": df["o_orderkey"].to_numpy(np.int64),
                             "tile": tile.astype(np.int64)})

    return bucketed.groupby("bucket").map_groups(per_bucket,
                                                 batch_format="pandas")


def order_price_ntile_oracle_sql(n: int = 4) -> str:
    return f"""
        SELECT o_orderkey,
               CAST(ntile({n}) OVER (ORDER BY o_totalprice, o_orderkey)
                    AS BIGINT) AS tile
        FROM orders"""


def _trade_graph(sf_dir: str, P: int):
    """Shared builder for the PageRank variants: the symmetrized
    customer-supplier edge Dataset (int64-encoded nodes, globally deduped,
    hash-partitioned by src with the partition column RETAINED) plus the
    per-node degree Dataset and the node count.  Returns (None, None, 0)
    when either input table is empty."""
    if _pq_rows(sf_dir, "orders") == 0 or _pq_rows(sf_dir, "lineitem") == 0:
        return None, None, 0

    # --- build edges: co-group lineitem and orders on orderkey -----------
    # uniform co-group schema: (part, key, val, side)  side 0=orders 1=li
    def ord_rows(t: pa.Table) -> pd.DataFrame:
        ok = t["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        ck = t["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pd.DataFrame({"part": (ok % P).astype(np.int32), "key": ok,
                             "val": ck, "side": np.int8(0)})

    def li_rows(t: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame({
            "key": t["l_orderkey"].to_numpy(zero_copy_only=False)
            .astype(np.int64),
            "val": t["l_suppkey"].to_numpy(zero_copy_only=False)
            .astype(np.int64)}).drop_duplicates()
        df.insert(0, "part", (df["key"].to_numpy() % P).astype(np.int32))
        df["side"] = np.int8(1)
        return df

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"]) \
        .map_batches(ord_rows, batch_format="pyarrow", zero_copy_batch=True)
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_suppkey"]) \
        .map_batches(li_rows, batch_format="pyarrow", zero_copy_batch=True)

    def cogroup_edges(g: pd.DataFrame) -> pd.DataFrame:
        o = g[g["side"] == 0][["key", "val"]]
        l = g[g["side"] == 1][["key", "val"]].drop_duplicates()
        m = l.merge(o, on="key", suffixes=("_s", "_c"))
        if not len(m):
            return pd.DataFrame({"src": pd.Series([], dtype=np.int64),
                                 "dst": pd.Series([], dtype=np.int64)})
        c = 2 * m["val_c"].to_numpy(np.int64)
        s = 2 * m["val_s"].to_numpy(np.int64) + 1
        out = pd.DataFrame({"src": np.concatenate([c, s]),
                            "dst": np.concatenate([s, c])}).drop_duplicates()
        return out

    pairs = orders.union(li).groupby("part").map_groups(
        cogroup_edges, batch_format="pandas")

    # global edge dedup + exact degrees in ONE exchange: after the src
    # co-location every row of a node lives in this group, so its exact
    # degree is a local value_counts — emitting (side=1) degree rows next
    # to the (side=0) edge rows saves the whole follow-up degree AllToAll
    # (measured ~5.6 s of fixed exchange cost at sf0.1 for a 16k-row
    # result).  The partition column stays on the rows (functionally
    # dependent on src) so the pinned variant can route whole partitions
    # to their actors.
    def dedup_part(df: pd.DataFrame) -> pd.DataFrame:
        e = df[["src", "dst", "part"]].drop_duplicates(["src", "dst"])
        if not len(e):
            return pd.DataFrame({"src": pd.Series([], dtype=np.int64),
                                 "dst": pd.Series([], dtype=np.int64),
                                 "part": pd.Series([], dtype=np.int32),
                                 "side": pd.Series([], dtype=np.int8)})
        vc = e["src"].value_counts()
        deg = pd.DataFrame({
            "src": vc.index.to_numpy(np.int64),
            "dst": vc.to_numpy(np.int64),
            "part": np.full(len(vc), e["part"].iloc[0], np.int32),
            "side": np.full(len(vc), 1, np.int8)})
        e = e.assign(side=np.int8(0))
        return pd.concat([e, deg], ignore_index=True)

    combined = partitioned_map(pairs, dedup_part, key="src",
                               num_partitions=P).materialize()

    def edge_view(t: pa.Table) -> pa.Table:
        return t.filter(pc.equal(t["side"], 0)) \
            .select(["src", "dst", "part"])

    def deg_view(t: pa.Table) -> pa.Table:
        d = t.filter(pc.equal(t["side"], 1))
        return pa.table({"node": d["src"], "deg": d["dst"]})

    edges = combined.map_batches(edge_view, batch_format="pyarrow",
                                 zero_copy_batch=True)
    degrees = combined.map_batches(deg_view, batch_format="pyarrow",
                                   zero_copy_batch=True)
    return edges, degrees, int(degrees.count())


_EMPTY_PR = {"node": pd.Series([], dtype=str),
             "rank": pd.Series([], dtype=float)}


def _pr_format(node_i: np.ndarray, rank: np.ndarray) -> pd.DataFrame:
    names = np.where(node_i % 2 == 0,
                     np.char.add("c:", (node_i // 2).astype(str)),
                     np.char.add("s:", (node_i // 2).astype(str)))
    return pd.DataFrame({"node": names.astype(str),
                         "rank": round_half_away(rank, 9)}) \
        .sort_values("node").reset_index(drop=True)


def customer_supplier_pagerank(sf_dir: str, iters: int = 3,
                               damping: float = 0.85,
                               num_partitions: int = 16):
    """PageRank (fixed ``iters`` damped power iterations) over the bipartite
    customer-supplier trade graph -- the engine's ITERATIVE-algorithm shape
    (connected components is the other; both keep per-node state as a
    DATASET, never a driver structure, so node count scales past memory).

    Graph: an undirected edge per distinct (customer, supplier) pair that
    co-occurs on an order.  Nodes are int64-encoded (``2*custkey`` /
    ``2*suppkey+1``) so every shuffle moves only narrow int columns; the
    string namespace (``c:<id>`` / ``s:<id>``) is restored once at output.

    NO ``Dataset.join`` anywhere: each keyed step is the repo's standard
    co-group -- union two same-schema frames, hash-partition on the key,
    one ``groupby("part").map_groups`` with a vectorized pandas merge
    inside the partition (same machinery as ``connected_components``,
    ``dedup.py:553``).  Per iteration that is two narrow shuffles (edges +
    rank messages out, inflow sum in) -- the canonical BSP step; a Pregel
    engine would pin edge partitions in actors to shuffle only messages,
    which this docstring notes as the scale-up path.  The small per-node
    rank table is materialized per round to keep the lazy plan flat.
    Dangling mass does not exist by construction (symmetrized graph =>
    deg >= 1 for every node).  Ranks round to 9 dp; the oracle replays the
    identical 3-iteration chain in SQL."""
    P = num_partitions
    edges, degrees, n_nodes = _trade_graph(sf_dir, P)
    if n_nodes == 0:
        return pd.DataFrame(_EMPTY_PR)

    # node-state co-group schema: (part, key, dst, x, side) side 0=state
    def state_schema(node: np.ndarray, dst: np.ndarray, x: np.ndarray,
                     side: int) -> pd.DataFrame:
        return pd.DataFrame({"part": (node % P).astype(np.int32),
                             "key": node, "dst": dst, "x": x,
                             "side": np.int8(side)})

    def edge_rows(df: pd.DataFrame) -> pd.DataFrame:
        src = df["src"].to_numpy(np.int64)
        return state_schema(src, df["dst"].to_numpy(np.int64),
                            np.full(len(df), np.nan), 1)

    edge_msgs = edges.map_batches(edge_rows, batch_format="pandas") \
        .materialize()

    def init_rank(df: pd.DataFrame) -> pd.DataFrame:
        node = df["node"].to_numpy(np.int64)
        return pd.DataFrame({"node": node,
                             "deg": df["deg"].to_numpy(np.int64),
                             "rank": np.full(len(df), 1.0 / n_nodes)})

    ranks = degrees.map_batches(init_rank, batch_format="pandas") \
        .materialize()

    def contrib_rows(df: pd.DataFrame) -> pd.DataFrame:
        node = df["node"].to_numpy(np.int64)
        c = df["rank"].to_numpy(np.float64) / df["deg"].to_numpy(np.int64)
        return state_schema(node, np.zeros(len(df), np.int64), c, 0)

    def flow(g: pd.DataFrame) -> pd.DataFrame:
        st = g[g["side"] == 0][["key", "x"]]
        ed = g[g["side"] == 1][["key", "dst"]]
        m = ed.merge(st, on="key")
        if not len(m):
            return pd.DataFrame({"node": pd.Series([], dtype=np.int64),
                                 "partial_r": pd.Series([], dtype=float)})
        gsum = m.groupby("dst", sort=False)["x"].sum()
        return pd.DataFrame({"node": gsum.index.to_numpy(np.int64),
                             "partial_r": gsum.to_numpy(np.float64)})

    def damp(g: pd.DataFrame) -> pd.DataFrame:
        st = g[g["side"] == 0][["key", "dst"]].rename(columns={"dst": "deg"})
        msg = g[g["side"] == 1]
        if not len(st):
            return pd.DataFrame({"node": pd.Series([], dtype=np.int64),
                                 "deg": pd.Series([], dtype=np.int64),
                                 "rank": pd.Series([], dtype=float)})
        r_in = msg.groupby("key", sort=False)["x"].sum()
        st = st.set_index("key")
        r = r_in.reindex(st.index, fill_value=0.0).to_numpy(np.float64)
        node = st.index.to_numpy(np.int64)
        return pd.DataFrame({"node": node,
                             "deg": st["deg"].to_numpy(np.int64),
                             "rank": (1.0 - damping) / n_nodes + damping * r})

    def deg_rows(df: pd.DataFrame) -> pd.DataFrame:
        node = df["node"].to_numpy(np.int64)
        return state_schema(node, df["deg"].to_numpy(np.int64),
                            np.full(len(df), np.nan), 0)

    deg_msgs = degrees.map_batches(deg_rows, batch_format="pandas") \
        .materialize()

    for _ in range(iters):
        c = ranks.map_batches(contrib_rows, batch_format="pandas")
        inflow = edge_msgs.union(c).groupby("part").map_groups(
            flow, batch_format="pandas")

        def msg_rows(df: pd.DataFrame) -> pd.DataFrame:
            node = df["node"].to_numpy(np.int64)
            return state_schema(node, np.zeros(len(df), np.int64),
                                df["partial_r"].to_numpy(np.float64), 1)

        msgs = inflow.map_batches(msg_rows, batch_format="pandas")
        ranks = deg_msgs.union(msgs).groupby("part").map_groups(
            damp, batch_format="pandas").materialize()

    out = ranks.to_pandas()
    return _pr_format(out["node"].to_numpy(np.int64),
                      out["rank"].to_numpy(np.float64))


def customer_supplier_pagerank_oracle_sql(iters: int = 3,
                                          damping: float = 0.85) -> str:
    if iters != 3:  # survives python -O, unlike assert
        raise ValueError("oracle replays exactly 3 iterations")
    d = damping
    return f"""
        WITH pairs AS (
            SELECT DISTINCT 'c:' || CAST(o.o_custkey AS VARCHAR) AS c,
                            's:' || CAST(l.l_suppkey AS VARCHAR) AS s
            FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey),
        edges AS (SELECT c AS src, s AS dst FROM pairs
                  UNION SELECT s, c FROM pairs),
        deg AS (SELECT src AS node, count(*) AS deg FROM edges GROUP BY src),
        n AS (SELECT count(*) AS n_nodes FROM deg),
        r0 AS (SELECT node, deg, 1.0 / n.n_nodes AS rank FROM deg, n),
        r1 AS (SELECT e.dst AS node, d.deg,
                      (1.0 - {d}) / n.n_nodes
                      + {d} * sum(r.rank / r.deg) AS rank
               FROM edges e JOIN r0 r ON r.node = e.src
               JOIN deg d ON d.node = e.dst CROSS JOIN n
               GROUP BY e.dst, d.deg, n.n_nodes),
        r2 AS (SELECT e.dst AS node, d.deg,
                      (1.0 - {d}) / n.n_nodes
                      + {d} * sum(r.rank / r.deg) AS rank
               FROM edges e JOIN r1 r ON r.node = e.src
               JOIN deg d ON d.node = e.dst CROSS JOIN n
               GROUP BY e.dst, d.deg, n.n_nodes),
        r3 AS (SELECT e.dst AS node, d.deg,
                      (1.0 - {d}) / n.n_nodes
                      + {d} * sum(r.rank / r.deg) AS rank
               FROM edges e JOIN r2 r ON r.node = e.src
               JOIN deg d ON d.node = e.dst CROSS JOIN n
               GROUP BY e.dst, d.deg, n.n_nodes)
        SELECT node, round(rank, 9) AS rank FROM r3"""

def lineitem_regression_stats(sf_dir: str):
    """Per-flag two-column moment aggregates: corr / covar_samp /
    regr_slope / regr_intercept of (l_quantity, l_extendedprice) — the
    engine's bivariate-statistics shape.

    Mergeable sufficient statistics (n, Σx, Σy, Σxx, Σyy, Σxy) are computed
    per batch with x/y SHIFTED by fixed pivots (corr/covar/slope are
    shift-invariant; the pivots keep Σxx ~ n·var instead of n·mean² so the
    naive-sums formula stays within ~1e-12 of DuckDB's streaming kernels),
    then one tiny groupby-sum merges them — the classic one-pass parallel
    aggregate; nothing but 6 doubles per (batch, group) ever shuffles."""
    X0, Y0 = 25.0, 40000.0  # fixed pivots ≈ column centers (any constant ok)
    ds = _read(sf_dir, "lineitem",
               ["l_returnflag", "l_quantity", "l_extendedprice"])

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        x = df["l_quantity"].to_numpy(np.float64) - X0
        y = df["l_extendedprice"].to_numpy(np.float64) - Y0
        df = pd.DataFrame({"l_returnflag": df["l_returnflag"],
                           "x": x, "y": y, "xx": x * x, "yy": y * y,
                           "xy": x * y, "n": np.int64(1)})
        g = df.groupby("l_returnflag", sort=False).sum().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    m = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True) \
        .groupby("l_returnflag").aggregate(
            Sum("x", alias_name="sx"), Sum("y", alias_name="sy"),
            Sum("xx", alias_name="sxx"), Sum("yy", alias_name="syy"),
            Sum("xy", alias_name="sxy"), Sum("n", alias_name="n")) \
        .to_pandas()
    n = m["n"].to_numpy(np.float64)
    cxy = m["sxy"] - m["sx"] * m["sy"] / n     # n·covar_pop numerators
    cxx = m["sxx"] - m["sx"] ** 2 / n
    cyy = m["syy"] - m["sy"] ** 2 / n
    slope = cxy / cxx
    mean_x, mean_y = m["sx"] / n + X0, m["sy"] / n + Y0
    out = pd.DataFrame({
        "l_returnflag": m["l_returnflag"],
        "n": m["n"].astype(np.int64),
        "corr_qty_price": round_half_away(
            (cxy / np.sqrt(cxx * cyy)).to_numpy(np.float64), 7),
        "covar_qty_price": round_half_away(
            (cxy / (n - 1)).to_numpy(np.float64), 4),
        "slope": round_half_away(slope.to_numpy(np.float64), 7),
        "intercept": round_half_away(
            (mean_y - slope * mean_x).to_numpy(np.float64), 4),
    })
    return out.sort_values("l_returnflag").reset_index(drop=True)


def lineitem_regression_stats_oracle_sql() -> str:
    return """
        SELECT l_returnflag,
               count(*) AS n,
               round(corr(l_extendedprice, l_quantity), 7)
                   AS corr_qty_price,
               round(covar_samp(l_extendedprice, l_quantity), 4)
                   AS covar_qty_price,
               round(regr_slope(l_extendedprice, l_quantity), 7) AS slope,
               round(regr_intercept(l_extendedprice, l_quantity), 4)
                   AS intercept
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""


def user_mode_event(sf_dir: str, num_partitions: int = 16):
    """Per-user MODE of event_type (most frequent value; ties break to the
    lexicographically smallest) — the argmax-of-counts shape, distinct from
    argmax-by-timestamp (``latest_user_event``).

    Stage 1 collapses to per-(user, type) partial counts inside each batch
    (vocabulary-bounded: at most |users|×|types| rows leave any batch);
    stage 2 merges counts and takes the per-user argmax inside ONE
    hash-partitioned vectorized pass — no per-user Python loop."""
    ds = _read(sf_dir, "events", ["user_id", "event_type"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.dropna(subset=["user_id"])
        g = df.groupby(["user_id", "event_type"], sort=False) \
            .size().reset_index(name="pn")
        g["user_id"] = g["user_id"].astype(np.int64)
        return g

    counts = ds.map_batches(partial, batch_format="pandas") \
        .groupby(["user_id", "event_type"]) \
        .aggregate(Sum("pn", alias_name="n"))

    def argmax(df: pd.DataFrame) -> pd.DataFrame:
        # sort (n desc, event_type asc) then keep first per user
        df = df.sort_values(["n", "event_type"],
                            ascending=[False, True], kind="mergesort")
        top = df.drop_duplicates("user_id")
        return pd.DataFrame({"user_id": top["user_id"].to_numpy(np.int64),
                             "mode_event": top["event_type"].to_numpy(),
                             "n": top["n"].to_numpy(np.int64)})

    return partitioned_map(counts, argmax, key="user_id",
                           num_partitions=num_partitions)


def user_mode_event_oracle_sql() -> str:
    return """
        WITH c AS (SELECT user_id, event_type, count(*) AS n
                   FROM events WHERE user_id IS NOT NULL
                   GROUP BY user_id, event_type)
        SELECT user_id, event_type AS mode_event, n
        FROM c
        QUALIFY row_number() OVER (PARTITION BY user_id
                                   ORDER BY n DESC, event_type) = 1"""

def event_value_mad(sf_dir: str):
    """Per-event-type MEDIAN ABSOLUTE DEVIATION of ``value`` — the robust
    dispersion statistic, and the engine's two-pass-with-broadcast-statistic
    shape: pass 1 computes each type's exact interpolated median over the
    distributed value-counts topology (:func:`quantile_cont_rollup`); the
    tiny per-type median table broadcasts ONCE via ``ray.put``; pass 2 runs
    the SAME topology over the derived ``|value - median|`` column.  Both
    passes replay DuckDB's quantile_cont IEEE operation order, so the
    doubles hash-match the oracle bit-for-bit with no rounding.  Continuous
    values mean the per-(key, deviation) counts don't collapse — the
    shuffle is sort-of-values-scale, the honest cost of an exact MAD."""
    import ray as _ray

    ds = _read(sf_dir, "events", ["event_type", "value"])

    def clean(df: pd.DataFrame) -> pd.DataFrame:
        return df.dropna(subset=["event_type", "value"])

    # both passes (median, |value-median| deviations) scan the same two
    # narrow columns — materialize the cleaned projection once instead of
    # re-reading/re-decoding the parquet per pass
    ds = ds.map_batches(clean, batch_format="pandas").materialize()
    med = quantile_cont_rollup(ds, "event_type", "value", (0.5,),
                               suffix="value").to_pandas()
    ref = _ray.put(pd.Series(med["c50_value"].to_numpy(np.float64),
                             index=med["event_type"].to_numpy()))

    def deviations(df: pd.DataFrame) -> pd.DataFrame:
        m = _ray.get(ref)
        dev = (df["value"].to_numpy(np.float64)
               - m.reindex(df["event_type"]).to_numpy(np.float64))
        return pd.DataFrame({"event_type": df["event_type"].to_numpy(),
                             "dev": np.abs(dev)})

    mad = quantile_cont_rollup(ds.map_batches(deviations,
                                              batch_format="pandas"),
                               "event_type", "dev", (0.5,),
                               suffix="dev").to_pandas()
    out = med.merge(mad[["event_type", "c50_dev"]], on="event_type")
    return pd.DataFrame({"event_type": out["event_type"],
                         "n": out["n"].to_numpy(np.int64),
                         "med_value": out["c50_value"].to_numpy(np.float64),
                         "mad_value": out["c50_dev"].to_numpy(np.float64)}) \
        .sort_values("event_type").reset_index(drop=True)


def event_value_mad_oracle_sql() -> str:
    return """
        WITH m AS (SELECT event_type, count(value) AS n,
                          median(value) AS med_value
                   FROM events
                   WHERE event_type IS NOT NULL AND value IS NOT NULL
                   GROUP BY event_type)
        SELECT e.event_type, m.n, m.med_value,
               median(abs(e.value - m.med_value)) AS mad_value
        FROM events e JOIN m USING (event_type)
        WHERE e.value IS NOT NULL
        GROUP BY e.event_type, m.n, m.med_value
        ORDER BY event_type"""

class _PRPartition:
    """One pinned edge partition of the Pregel-style PageRank: the actor
    holds its src-partition's edges and per-node ranks for the whole run,
    so iterations ship ONLY pre-combined rank messages (the Dataset
    variant re-shuffles the full edge set every round — at 10^12 edges
    that is the dominant cost; here edges cross the object store once)."""

    def __init__(self, pid: int, P: int, damping: float, n_nodes: int):
        self.pid, self.P = pid, P
        self.damping, self.n = damping, n_nodes
        self._chunks: list[pd.DataFrame] = []

    def load(self, df: pd.DataFrame) -> int:
        self._chunks.append(df[["src", "dst"]])
        return len(df)

    def finalize(self) -> int:
        """Index the partition once: per-edge src positions for O(E) local
        contribution gathers, per-target-part edge slices pre-sorted so
        emit() is P vectorized groupby-sums with zero per-iteration setup."""
        from ..stages.partition import stable_hash

        e = pd.concat(self._chunks, ignore_index=True) if self._chunks else \
            pd.DataFrame({"src": pd.Series([], dtype=np.int64),
                          "dst": pd.Series([], dtype=np.int64)})
        self._chunks = []
        src = e["src"].to_numpy(np.int64)
        dst = e["dst"].to_numpy(np.int64)
        # local nodes + EXACT degrees (all rows of a src live here)
        self.nodes, self.deg = np.unique(src, return_counts=True)
        self.rank = np.full(len(self.nodes), 1.0 / self.n) if self.n else \
            np.zeros(0)
        # per-edge index into the local node array
        src_pos = np.searchsorted(self.nodes, src)
        tpart = (stable_hash(pd.Series(dst)) % self.P).astype(np.int64)
        order = np.argsort(tpart, kind="stable")
        self._src_pos = src_pos[order]
        self._dst = dst[order]
        self._bounds = np.searchsorted(tpart[order], np.arange(self.P + 1))
        return len(self.nodes)

    def emit(self):
        """One tuple of P pre-combined message frames (dst, c) — the local
        combiner sums per dst inside each target slice before anything
        ships (the classic Pregel combine)."""
        contrib = self.rank / self.deg if len(self.nodes) else np.zeros(0)
        c_edge = contrib[self._src_pos] if len(self._src_pos) else np.zeros(0)
        out = []
        for q in range(self.P):
            lo, hi = int(self._bounds[q]), int(self._bounds[q + 1])
            if hi <= lo:
                out.append(pd.DataFrame(
                    {"dst": pd.Series([], dtype=np.int64),
                     "c": pd.Series([], dtype=np.float64)}))
                continue
            g = pd.DataFrame({"dst": self._dst[lo:hi],
                              "c": c_edge[lo:hi]}) \
                .groupby("dst", sort=True, as_index=False)["c"].sum()
            out.append(g)
        return tuple(out)

    def apply(self, *frames) -> int:
        msgs = pd.concat(frames, ignore_index=True)
        r_in = msgs.groupby("dst", sort=True)["c"].sum() \
            .reindex(self.nodes, fill_value=0.0).to_numpy(np.float64)
        self.rank = (1.0 - self.damping) / self.n + self.damping * r_in
        return len(self.nodes)

    def collect(self) -> pd.DataFrame:
        return pd.DataFrame({"node": self.nodes, "rank": self.rank})


def customer_supplier_pagerank_pinned(sf_dir: str, iters: int = 3,
                                      damping: float = 0.85,
                                      num_partitions: int = 8,
                                      actor_cpus: float = 0.25,
                                      spread: bool = True):
    """Pregel-style PageRank: same graph, same math, same oracle as
    :func:`customer_supplier_pagerank`, but the edge partitions are PINNED
    in long-lived actors (the deliberate drop below the Dataset API — the
    one semantic Datasets can't express is state that must NOT move
    between supersteps).  Edges cross the object store exactly once at
    load; each iteration ships only per-target pre-combined rank messages,
    routed actor-to-actor as object refs (the driver passes refs, never
    data).  This is the 10^12-edge scale path the Dataset variant's
    docstring points at; both stay registered so the oracle gates both."""
    P = num_partitions
    edges, degrees, n_nodes = _trade_graph(sf_dir, P)
    if n_nodes == 0:
        return pd.DataFrame(_EMPTY_PR)

    # Multi-node: SPREAD places edge partitions on distinct nodes so edge
    # memory scales with the cluster; rank messages then flow node-to-node
    # as object refs without a driver hop (MULTINODE.md).
    opts = {"num_cpus": actor_cpus}
    if spread:
        opts["scheduling_strategy"] = "SPREAD"
    cls = ray.remote(**opts)(_PRPartition)
    actors = [cls.remote(p, P, damping, n_nodes) for p in range(P)]

    def push(df: pd.DataFrame) -> pd.DataFrame:
        # Edges arrive already part-grouped from _trade_graph's exchange
        # (blocks = map_groups outputs), so routing is a per-batch slice
        # fan-out — no second AllToAll; load() appends, finalize() concats,
        # so a part split across batches is fine.
        acks, pids, rows = [], [], []
        for pid, g in df.groupby("part", sort=False):
            acks.append(actors[int(pid)].load.remote(g[["src", "dst"]]))
            pids.append(int(pid))
            rows.append(len(g))
        ray.get(acks)
        return pd.DataFrame({"pid": np.array(pids, dtype=np.int64),
                             "rows": np.array(rows, dtype=np.int64)})

    # route each edge partition to its actor cluster-side (the streaming
    # router pattern); the driver sees only (pid, rows) acks
    edges.map_batches(push, batch_format="pandas").materialize()
    ray.get([a.finalize.remote() for a in actors])

    for _ in range(iters):
        outs = [a.emit.options(num_returns=P).remote() for a in actors]
        ray.get([actors[q].apply.remote(*[outs[p][q] for p in range(P)])
                 for q in range(P)])

    out = pd.concat(ray.get([a.collect.remote() for a in actors]),
                    ignore_index=True)
    for a in actors:
        ray.kill(a)
    return _pr_format(out["node"].to_numpy(np.int64),
                      out["rank"].to_numpy(np.float64))

def _interleave16(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Morton/Z-order interleave of two 16-bit columns into one int64 —
    vectorized magic-number bit spreading (public technique, e.g. the
    "Interleave bits by Binary Magic Numbers" page of Sean Anderson's Bit
    Twiddling Hacks)."""
    def spread(x: np.ndarray) -> np.ndarray:
        x = x.astype(np.int64) & 0xFFFF
        x = (x | (x << 8)) & 0x00FF00FF
        x = (x | (x << 4)) & 0x0F0F0F0F
        x = (x | (x << 2)) & 0x33333333
        x = (x | (x << 1)) & 0x55555555
        return x

    return spread(a) | (spread(b) << 1)


def events_zorder_pruned(sf_dir: str, user_lo: int = 1, user_hi: int = 6,
                         day_lo: int = 19728, day_hi: int = 19742,
                         n_files: int = 16):
    """Physical-layout op: Z-ORDER the events table on (user_id, day) and
    answer a 2-D range query through parquet footer min/max pruning.

    The point of the z-curve: a sort on ONE column makes only that
    column's per-file ranges tight; sorting by the interleaved Morton code
    makes BOTH columns' per-file min/max tight simultaneously, so a
    rectangle query prunes files on either dimension.  Layout: z-bucket =
    top bits of the Morton code (``n_files`` buckets, one file each,
    written hive-partitioned with commit markers); query: footer
    min/max intersection picks the files, pyarrow row filters finish the
    job.  Results are layout-transparent (the oracle is the plain SQL
    range query); the PRUNING (files opened < files written) is asserted
    by pytest, not the oracle."""
    import glob
    import shutil
    import tempfile

    import pyarrow.parquet as pq

    from ..sinks.batch import write_hive_partitioned

    if _pq_rows(sf_dir, "events") == 0:
        return pd.DataFrame({"event_id": pd.Series([], dtype=np.int64),
                             "user_id": pd.Series([], dtype=np.int64),
                             "day": pd.Series([], dtype=np.int64)})

    def add_z(df: pd.DataFrame) -> pd.DataFrame:
        df = df.dropna(subset=["user_id"])
        u = df["user_id"].to_numpy(np.int64)
        day = (df["ts"].to_numpy("datetime64[us]").astype(np.int64)
               // 86_400_000_000)
        z = _interleave16(u, day)
        return pd.DataFrame({"event_id": df["event_id"].to_numpy(np.int64),
                             "user_id": u, "day": day, "z": z})

    zds = _read(sf_dir, "events", ["event_id", "user_id", "ts"]) \
        .map_batches(add_z, batch_format="pandas").materialize()

    # rank-based bucket bounds from per-batch evenly-ranked z samples (the
    # boundary-sampling trick Ray's own sort uses) — top-bits bucketing
    # would collapse when the key space is sparsely used
    def z_sample(df: pd.DataFrame) -> pd.DataFrame:
        z = np.sort(df["z"].to_numpy(np.int64))
        idx = np.linspace(0, len(z) - 1, num=min(64, len(z))).astype(int)
        return pd.DataFrame({"z": z[idx]})

    samp = np.sort(zds.map_batches(z_sample, batch_format="pandas")
                   .to_pandas()["z"].to_numpy(np.int64))
    bounds = samp[np.linspace(0, len(samp) - 1,
                              num=n_files + 1).astype(int)][1:-1] \
        if len(samp) > n_files else np.array([], dtype=np.int64)

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["zbucket"] = np.searchsorted(
            bounds, df["z"].to_numpy(np.int64)).astype(np.int64)
        return df

    ds = zds.map_batches(add_bucket, batch_format="pandas")

    work = tempfile.mkdtemp(prefix="pwr_zorder_")
    try:
        write_hive_partitioned(ds, work, by="zbucket")
        files = sorted(glob.glob(f"{work}/zbucket=*/*.parquet"))
        opened = []
        for f in files:
            md = pq.ParquetFile(f).metadata
            hit = False
            for rg in range(md.num_row_groups):
                row = md.row_group(rg)
                cols = {row.column(i).path_in_schema: row.column(i).statistics
                        for i in range(row.num_columns)}
                su, sd = cols.get("user_id"), cols.get("day")
                if su is None or sd is None or not su.has_min_max \
                        or not sd.has_min_max:
                    hit = True  # no stats: cannot prune, must read
                    break
                if (su.min <= user_hi and su.max >= user_lo
                        and sd.min <= day_hi and sd.max >= day_lo):
                    hit = True
                    break
            if hit:
                opened.append(f)
        events_zorder_pruned.last_prune = (len(opened), len(files))
        if not opened:
            return pd.DataFrame({"event_id": pd.Series([], dtype=np.int64),
                                 "user_id": pd.Series([], dtype=np.int64),
                                 "day": pd.Series([], dtype=np.int64)})
        import pyarrow.dataset as pads

        t = pads.dataset(opened).to_table(
            columns=["event_id", "user_id", "day"],
            filter=((pads.field("user_id") >= user_lo)
                    & (pads.field("user_id") <= user_hi)
                    & (pads.field("day") >= day_lo)
                    & (pads.field("day") <= day_hi)))
        return t.to_pandas().sort_values("event_id").reset_index(drop=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)


def events_zorder_oracle_sql(user_lo: int = 1, user_hi: int = 6,
                             day_lo: int = 19728, day_hi: int = 19742) -> str:
    return f"""
        SELECT event_id, user_id,
               CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day
        FROM events
        WHERE user_id BETWEEN {user_lo} AND {user_hi}
          AND CAST(floor(epoch(ts) / 86400) AS BIGINT)
              BETWEEN {day_lo} AND {day_hi}
        ORDER BY event_id"""
