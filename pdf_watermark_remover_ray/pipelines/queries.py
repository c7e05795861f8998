"""Query registry: every operator as a ``(sf_dir) -> result`` callable plus
its DuckDB oracle SQL (the driver's correctness gate).

Column names match between Ray results and SQL (the driver sorts columns by
name and value-hashes), and floats are rounded identically on both sides.
The hash-based families (MinHash-LSH, SimHash, hyperplane-LSH ANN, KMV,
winnow) use md5-prefix hashes + literal-embedded seed constants precisely so
DuckDB can replay them EXACTLY (see the _*_sql builders below).  Only the
genuinely non-SQL operators ship without an oracle entry → rows-only check,
with their real goldens in tests/: span-surgery scrub (`scrub_full`), the
streaming engine itself (`streaming_e2e`), and IVF ANN (data-dependent
k-means centroids; the clustered variant is equality-tested against it).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..config import ScrubConfig, StreamConfig
from ..functions.scrub import scrub_dataset
from ..functions.sampling import (
    capped_sample_oracle_sql,
    capped_sample_per_group,
    weighted_sample_documents,
    weighted_sample_oracle_sql,
    decontaminate_oracle_sql,
    decontaminate_split,
    ngram_decontaminate,
    ngram_decontaminate_oracle_sql,
    mix_rebalanced_documents,
    mix_rebalanced_oracle_sql,
    sample_documents,
    sample_oracle_sql,
    shuffle_documents,
    shuffle_oracle_sql,
    split_documents,
    split_oracle_sql,
    stratified_oracle_sql,
    stratified_sample_documents,
)
from ..functions.sketches import (
    approx_distinct_users,
    approx_quantiles_oracle_sql,
    cms_oracle_sql,
    cms_user_counts,
    events_quantiles_approx,
    heavy_hitter_events,
    heavy_hitters_oracle_sql,
    kmv_oracle_sql,
)
from ..sources.transcripts import TRANSCRIPTS_CTE, derive_transcripts
from ..stages.join import stream_join
from ..stages.watermark import late_rows
from ..stages.windows import session_windows, sliding_counts, tumbling_counts
from . import curate as _curate
from . import dedup, multimodal, relational, similarity, text

# window params used by the transcript queries (microseconds)
SIZE_US = 3_600_000_000
SLIDE_US = 900_000_000
GAP_US = 1_800_000_000
# 30 min: below the scramble-block event-time span at every sf (the span
# shrinks as event density grows), so the late path is exercised at sf 0.001,
# 0.01 AND 0.1.
LATENESS_US = 1_800_000_000
EPOCH_SIZE = 100
SCRAMBLE = 256

# scrub patterns that actually occur in the documents corpus
DOC_NAME_PATTERN = "customer"
DOC_FOOTER_PATTERN = "window"

# CEP: role-sequence pattern + event-time span bound (1 day — events per
# conversation are hours apart in the testdata, so a session-scale bound
# would leave zero matches while a day-scale one still EXERCISES the
# predicate: some contiguous matches do exceed it at every sf).
CEP_PATTERN = ("user", "tool", "assistant")
CEP_WITHIN_US = 86_400_000_000
# per-term predicates for the DEFINE-clause generalization: the user turn's
# text must carry a two-digit k payload (~90% of rows), the tool turn must be
# specifically an error — same regex dialect in pandas re and DuckDB RE2
CEP_TEXT_REGEX = '"k": [1-9][0-9]'


def _transcripts(sf_dir: str):
    return derive_transcripts(sf_dir, num_partitions=16)


def q_transcripts(sf_dir: str):
    return _transcripts(sf_dir)


def q_scrub_docs(sf_dir: str):
    import ray.data

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    cfg = ScrubConfig(name_pattern=DOC_NAME_PATTERN, footer_pattern=DOC_FOOTER_PATTERN)
    return scrub_dataset(ds, cfg)


def q_scrub_full(sf_dir: str):
    """Full T1-T5 kernel over the seeded pattern corpus (non-SQL: span surgery
    — golden-tested in tests/test_scrub.py instead)."""
    import ray.data

    from ..sources.transcripts import generate_transcripts

    table = generate_transcripts(n_convs=300, mean_turns=8, seed=42)
    return scrub_dataset(ray.data.from_arrow(table), ScrubConfig()) \
        .select_columns(["conv_id", "turn_idx", "text", "modified"])


def q_scrub_docs_footer_off(sf_dir: str):
    """T2's toggle: footer pattern disabled (reference passes '' when the
    checkbox is off, ui/app_ui.py:280-282) — only the name pattern fires."""
    import ray.data

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    cfg = ScrubConfig(name_pattern=DOC_NAME_PATTERN,
                      footer_pattern=DOC_FOOTER_PATTERN, use_footer=False)
    return scrub_dataset(ds, cfg)


def q_transcript_summary(sf_dir: str):
    """Global counts incl. a distinct aggregation: per-batch partial distinct
    sets merged in one small reduce (no row-level shuffle).  The second-stage
    totals are a Dataset aggregate — the per-conv grouped table NEVER reaches
    the driver (at 10^9 conversations it would be a 10^9-row to_pandas)."""
    import pyarrow as pa

    ds = _transcripts(sf_dir)

    def partial(t: pa.Table) -> pa.Table:
        convs = pd.unique(t["conv_id"].to_pandas())
        if len(convs) == 0:  # empty batch: [len]+[0]*(n-1) would be length 1
            return pa.table({"conv_id": pa.array([], pa.string()),
                             "partial_n": pa.array([], pa.int64())})
        return pa.table({"conv_id": pa.array(convs, pa.string()),
                         "partial_n": pa.array(
                             [len(t)] + [0] * (len(convs) - 1), pa.int64())})

    from ray.data.aggregate import Count, Sum

    parts = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    per_conv = parts.groupby("conv_id").aggregate(Sum("partial_n", alias_name="n"))
    totals = per_conv.aggregate(Sum("n", alias_name="n_turns"),
                                Count(alias_name="n_convs"))
    return pd.DataFrame({"n_turns": [int(totals["n_turns"])],
                         "n_convs": [int(totals["n_convs"])]})


def q_tumbling(sf_dir: str):
    return tumbling_counts(_transcripts(sf_dir), SIZE_US)


def q_sliding(sf_dir: str):
    return sliding_counts(_transcripts(sf_dir), SIZE_US, SLIDE_US)


def q_sessions(sf_dir: str):
    return session_windows(_transcripts(sf_dir), GAP_US, num_partitions=16)


def q_join(sf_dir: str):
    return stream_join(_transcripts(sf_dir), GAP_US, num_partitions=16)


def q_late(sf_dir: str):
    ds = derive_transcripts(sf_dir, num_partitions=16, keep_event_id=True)
    df = late_rows(ds, LATENESS_US, EPOCH_SIZE, scramble_block=SCRAMBLE).to_pandas()
    if not len(df.columns):  # an all-empty Dataset drops its schema
        df = pd.DataFrame({"conv_id": pd.Series([], dtype=str),
                           "turn_idx": pd.Series([], dtype=np.int32),
                           "epoch": pd.Series([], dtype=np.int32)})
    return df


def q_tool_latency_quantiles(sf_dir: str):
    """Operator composition: the stream join's matched (user → tool) pairs
    feed the distributed value-counts quantile rollup — per tool, the p50 /
    p95 response latency.  Both building blocks are already oracle-verified;
    this checks they compose (same select rule as events_quantiles:
    ``quantile_disc`` element selection, no interpolation)."""
    matches = stream_join(_transcripts(sf_dir), GAP_US, num_partitions=16)
    return relational.quantile_rollup(matches, "tool", "dt_us",
                                      qs=(0.5, 0.95), suffix="dt_us")


def q_range_join(sf_dir: str):
    """1:N interval/range join: every (user, tool) pair within the gap —
    the as-of join's all-matches sibling (stages/join.range_join)."""
    from ..stages.join import range_join

    return range_join(_transcripts(sf_dir), GAP_US, num_partitions=16)


def q_events_orders_asof(sf_dir: str):
    """Two-TABLE as-of join: each event enriched with the user's most recent
    order at-or-before the event time (stages/join.asof_join_tables — the
    classic slowly-arriving-fact enrichment; stream_join/range_join co-locate
    one stream, this co-partitions two independent Datasets)."""
    import ray.data

    from ..stages.join import asof_join_tables
    from ..stages.windows import ts_us_series

    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_id", "user_id", "ts"])
    od = ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                               columns=["o_orderkey", "o_custkey",
                                        "o_orderdate"])

    def pe(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"user_id": df["user_id"].to_numpy(np.int64),
                             "ts_us": ts_us_series(df["ts"]),
                             "event_id": df["event_id"].to_numpy(np.int64)})

    def po(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"user_id": df["o_custkey"].to_numpy(np.int64),
                             "ts_us": ts_us_series(df["o_orderdate"]),
                             "o_orderkey": df["o_orderkey"].to_numpy(np.int64)})

    return asof_join_tables(ev.map_batches(pe, batch_format="pandas"),
                            od.map_batches(po, batch_format="pandas"),
                            key="user_id", left_cols=["event_id"],
                            right_cols=["o_orderkey"],
                            right_tie="o_orderkey", num_partitions=16)


def q_orders_events_asof_fwd(sf_dir: str):
    """FORWARD as-of: each order enriched with the customer's FIRST event
    at-or-after the order date (the lead-looking sibling of
    events_orders_asof — "what did the customer do after buying"; ties on
    equal event ts go to the smallest event_id, merge_asof's
    first-row-in-sort-order rule)."""
    import ray.data

    from ..stages.join import asof_join_tables
    from ..stages.windows import ts_us_series

    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_id", "user_id", "ts"])
    od = ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                               columns=["o_orderkey", "o_custkey",
                                        "o_orderdate"])

    def pe(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"user_id": df["user_id"].to_numpy(np.int64),
                             "ts_us": ts_us_series(df["ts"]),
                             "event_id": df["event_id"].to_numpy(np.int64)})

    def po(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"user_id": df["o_custkey"].to_numpy(np.int64),
                             "ts_us": ts_us_series(df["o_orderdate"]),
                             "o_orderkey": df["o_orderkey"].to_numpy(np.int64)})

    return asof_join_tables(od.map_batches(po, batch_format="pandas"),
                            ev.map_batches(pe, batch_format="pandas"),
                            key="user_id", left_cols=["o_orderkey"],
                            right_cols=["event_id"],
                            right_tie="event_id", num_partitions=16,
                            direction="forward")


def q_session_labels(sf_dir: str):
    """Per-turn session ordinal (row→window assignment of session_windows)."""
    from ..stages.windows import session_labels

    return session_labels(_transcripts(sf_dir), GAP_US, num_partitions=16)


def q_enriched_turns(sf_dir: str):
    """Stream-table BROADCAST join, batch analog of the ``enrich`` output
    stream (pipelines/streaming._emit_enrich_file): tool turns decorated
    with the static dim (tool → group, weight), misses falling back to
    ('unknown', 0.0) — left-join semantics without a shuffle (the dim ships
    once via ``ray.put``; at any corpus size only the turn stream moves)."""
    import ray as _ray

    from ..config import StreamConfig

    dim = StreamConfig().enrich_dim
    tools = np.asarray([d[0] for d in dim], dtype=object)
    order = np.argsort(tools)
    ref = _ray.put((tools[order],
                    np.asarray([d[1] for d in dim], dtype=object)[order],
                    np.asarray([d[2] for d in dim], dtype=np.float64)[order]))

    def probe(t):
        import pyarrow as pa
        import pyarrow.compute as pc

        tools_, groups_, weights_ = _ray.get(ref)
        sub = t.filter(pc.equal(t["role"], "tool"))
        tv = sub["tool"].to_numpy(zero_copy_only=False)
        n = len(tv)
        if len(tools_) and n:
            pos = np.searchsorted(tools_, tv).clip(max=len(tools_) - 1)
            hit = tools_[pos] == tv
            g = np.where(hit, groups_[pos], "unknown")
            w = np.where(hit, weights_[pos], 0.0)
        else:
            g = np.full(n, "unknown", dtype=object)
            w = np.zeros(n, np.float64)
        return pa.table({"conv_id": sub["conv_id"],
                         "turn_idx": sub["turn_idx"],
                         "tool": sub["tool"],
                         "tool_group": pa.array(g.astype(str)),
                         "tool_weight": pa.array(w)})

    return _transcripts(sf_dir).map_batches(probe, batch_format="pyarrow",
                                            zero_copy_batch=True)


def q_cep_funnel(sf_dir: str):
    """CEP contiguous sequence: user → tool → assistant turns back-to-back in
    one conversation within a day (MATCH_RECOGNIZE ``SKIP TO NEXT ROW``)."""
    from ..stages.cep import sequence_matches

    return sequence_matches(_transcripts(sf_dir), CEP_PATTERN, CEP_WITHIN_US,
                            num_partitions=16)


def q_cep_timeouts(sf_dir: str):
    """CEP NEGATION: user turns with no assistant reply within a day —
    absence/timeout detection, the pattern class a positive matcher can't
    express (stages/cep.absence_matches)."""
    from ..stages.cep import absence_matches

    return absence_matches(_transcripts(sf_dir), CEP_WITHIN_US,
                           num_partitions=16)


def q_cep_pred_funnel(sf_dir: str):
    """CEP with per-term predicates (MATCH_RECOGNIZE DEFINE clause): user
    turn whose text matches a regex → tool turn that is specifically an
    error → assistant turn, contiguous, within a day."""
    from ..stages.cep import Term, predicated_sequence_matches

    terms = (Term(role="user", text_regex=CEP_TEXT_REGEX),
             Term(role="tool", tool="error"),
             Term(role="assistant"))
    return predicated_sequence_matches(_transcripts(sf_dir), terms,
                                       CEP_WITHIN_US, num_partitions=16)


def q_cep_followed_by(sf_dir: str):
    """CEP non-contiguous ``A ... B within T``: user turn eventually followed
    (any number of turns between) by a purchase tool turn within a day —
    time-based positive counterpart of the negation pattern."""
    from ..stages.cep import Term, followed_by_matches

    return followed_by_matches(_transcripts(sf_dir),
                               first=Term(role="user"),
                               then=Term(role="tool", tool="purchase"),
                               within_us=CEP_WITHIN_US, num_partitions=16)


def q_collapse_repeat_turns(sf_dir: str):
    """Ordered window dedup: drop turns equal to the previous turn's text."""
    return text.collapse_repeat_turns(_transcripts(sf_dir), num_partitions=16)


def q_dedup_turns(sf_dir: str):
    """Corpus-wide unit-level (turn) exact dedup, order-defined winner."""
    return text.dedup_turns(_transcripts(sf_dir), num_partitions=16)


def q_pii_redact_turns(sf_dir: str):
    """Ordered-regex PII redaction over transcript turns (actor pool)."""
    return text.pii_redact_turns(_transcripts(sf_dir))


def q_cep_tool_bursts(sf_dir: str):
    """CEP Kleene-plus: user (tool)+ assistant — maximal consecutive tool
    runs bracketed by a user and an assistant turn."""
    from ..stages.cep import kleene_matches

    return kleene_matches(_transcripts(sf_dir), CEP_WITHIN_US,
                          num_partitions=16)


def q_streaming_e2e(sf_dir: str):
    """Full streaming engine (epochs, watermark, state, exactly-once sink) on
    the seeded fixture; returns the emitted turn rows.  Non-SQL — its golden
    conformance lives in tests/test_streaming.py."""
    import glob
    import shutil
    import tempfile

    import pyarrow.parquet as pq

    from ..pipelines.streaming import StreamingEngine
    from ..sources.transcripts import generate_transcripts, write_transcripts

    table = generate_transcripts(n_convs=100, mean_turns=10, seed=42, late_frac=0.05)
    work = tempfile.mkdtemp(prefix="pwr_stream_")
    try:
        paths = write_transcripts(table, f"{work}/in", num_files=8)
        cfg = StreamConfig(num_partitions=8)
        StreamingEngine(paths, f"{work}/out", cfg, epoch_files=2).run()
        files = sorted(glob.glob(f"{work}/out/data/turns/epoch=*/part-*.parquet"))
        frames = [pq.read_table(f).to_pandas() for f in files]
        out = pd.concat(frames, ignore_index=True)
        return out.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)


# ---------------------------------------------------------------------------


def q_partitioned_roundtrip(sf_dir: str, langs=("en", "fr")):
    """Resumable batch sink round-trip: documents written hive-partitioned
    by lang (per-partition _SUCCESS commit markers), then read back with
    PHYSICAL pruning — only the requested lang directories are opened
    (sinks/batch.write_hive_partitioned / read_hive_partitioned)."""
    import shutil
    import tempfile

    import ray.data

    from ..sinks.batch import (read_hive_partitioned,
                               write_hive_partitioned)

    work = tempfile.mkdtemp(prefix="pwr_part_")
    try:
        ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                   columns=["doc_id", "lang"])
        write_hive_partitioned(ds, work, by="lang")
        out = read_hive_partitioned(work, "lang", values=langs) \
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        return out[["doc_id", "lang"]]
    finally:
        shutil.rmtree(work, ignore_errors=True)


def q_jsonl_roundtrip(sf_dir: str):
    """JSONL source/sink path (the interchange format LLM corpora actually
    arrive in): documents stream to line-delimited JSON via
    ``Dataset.write_json`` (one shard per block — the write itself is
    distributed, no driver serialization) and back via ``read_json``;
    the oracle (the plain parquet table) proves the format roundtrip is
    lossless including null text."""
    import shutil
    import tempfile

    import ray.data

    work = tempfile.mkdtemp(prefix="pwr_jsonl_")
    try:
        ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                   columns=["doc_id", "text", "lang",
                                            "n_chars"])
        ds.write_json(work)
        back = ray.data.read_json(work).to_pandas()
        back["doc_id"] = back["doc_id"].astype(np.int64)
        back["n_chars"] = back["n_chars"].astype(np.int64)
        return back[["doc_id", "text", "lang", "n_chars"]] \
            .sort_values("doc_id").reset_index(drop=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)


def q_csv_roundtrip(sf_dir: str):
    """CSV source/sink path (the other interchange format): the NUMERIC
    projection of events streams to CSV shards via ``Dataset.write_csv``
    and back via ``read_csv`` (schema re-inferred from the files); the
    parquet-table oracle proves the roundtrip lossless.  Text columns stay
    out of the CSV path on purpose — CSV's quoting/NULL ambiguity makes it
    the wrong carrier for free text (that is what the JSONL path is for),
    and the docstring IS that policy."""
    import shutil
    import tempfile

    import ray.data

    work = tempfile.mkdtemp(prefix="pwr_csv_")
    try:
        ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                                   columns=["event_id", "user_id", "value"])
        ds.write_csv(work)
        back = ray.data.read_csv(work).to_pandas()
        back["event_id"] = back["event_id"].astype(np.int64)
        return back[["event_id", "user_id", "value"]] \
            .sort_values("event_id").reset_index(drop=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)


def queries() -> dict:
    return {
        # transcript / streaming family
        "transcripts": q_transcripts,
        "scrub_docs": q_scrub_docs,
        "scrub_docs_footer_off": q_scrub_docs_footer_off,
        "scrub_full": q_scrub_full,
        "transcript_summary": q_transcript_summary,
        "tumbling_counts": q_tumbling,
        "sliding_counts": q_sliding,
        "session_windows": q_sessions,
        "stream_join": q_join,
        "range_join": q_range_join,
        "events_orders_asof": q_events_orders_asof,
        "orders_events_asof_fwd": q_orders_events_asof_fwd,
        "session_labels": q_session_labels,
        "enriched_turns": q_enriched_turns,
        "tool_latency_quantiles": q_tool_latency_quantiles,
        "dup_spans": dedup.dup_spans,
        "curate_corpus": _curate.curate_corpus,
        "prepared_corpus": _curate.prepared_corpus,
        "dedup_turns": q_dedup_turns,
        "collapse_repeat_turns": q_collapse_repeat_turns,
        "pii_redacted_turns": q_pii_redact_turns,
        "repetition_scores": text.repetition_scores,
        "token_entropy": text.token_entropy,
        "normalized_docs": text.normalize_docs,
        "cms_user_counts": cms_user_counts,
        "user_activity_outer": relational.user_activity_outer,
        "capped_sample_per_group": capped_sample_per_group,
        "weighted_sample_documents": weighted_sample_documents,
        "events_window_distinct": relational.events_window_distinct,
        "user_daily_locf": relational.user_daily_locf,
        "order_percent_rank": relational.order_percent_rank,
        "top_customers_with_ties": relational.top_customers_with_ties,
        "orders_yoy_growth": relational.orders_yoy_growth,
        "cep_funnel": q_cep_funnel,
        "cep_pred_funnel": q_cep_pred_funnel,
        "cep_followed_by": q_cep_followed_by,
        "cep_tool_bursts": q_cep_tool_bursts,
        "cep_timeouts": q_cep_timeouts,
        "late_drops": q_late,
        "streaming_e2e": q_streaming_e2e,
        # relational family
        "q1_pricing_summary": relational.q1_pricing_summary,
        "q3_top_orders": relational.q3_top_orders,
        "q5_revenue_by_nation": relational.q5_revenue_by_nation,
        "q7_volume_shipping": relational.q7_volume_shipping,
        "q6_forecast_revenue": relational.q6_forecast_revenue,
        "q10_returned_items": relational.q10_returned_items,
        "q14_promo_revenue": relational.q14_promo_revenue,
        "q17_small_qty_revenue": relational.q17_small_quantity_revenue,
        "q18_large_orders": relational.q18_large_orders,
        "q19_disjunctive_revenue": relational.q19_disjunctive_revenue,
        "q4_order_priority": relational.q4_order_priority,
        "q8_market_share": relational.q8_market_share,
        "q13_custdist": relational.q13_custdist,
        "q15_top_supplier": relational.q15_top_supplier,
        "q21_waiting_suppliers": relational.q21_waiting_suppliers,
        "q22_global_sales": relational.q22_global_sales,
        "customers_without_events": relational.customers_without_events,
        "bloom_semijoin_revenue": relational.bloom_semijoin_revenue,
        "topk_orders_per_customer": relational.topk_orders_per_customer,
        "customers_without_urgent_orders":
            relational.customers_without_urgent_orders,
        "customer_order_counts": relational.customer_order_counts,
        "order_priority_counts": relational.order_priority_counts,
        "events_windowed_stats": relational.events_windowed_stats,
        "events_quantiles": relational.events_quantiles,
        "events_quantiles_cont": relational.events_quantiles_cont,
        "moving_revenue_sum": relational.moving_revenue_sum,
        "events_range_sum": relational.events_range_sum,
        "users_with_events_and_orders":
            relational.users_with_events_and_orders,
        "order_priority_rollup": relational.order_priority_rollup,
        "order_priority_cube": relational.order_priority_cube,
        "event_user_cube": relational.event_user_cube,
        "orders_global_rank": relational.orders_global_rank,
        "latest_user_event": relational.latest_user_event,
        "lineitem_regression_stats": relational.lineitem_regression_stats,
        "user_mode_event": relational.user_mode_event,
        "event_value_mad": relational.event_value_mad,
        "events_zorder_pruned": relational.events_zorder_pruned,
        "order_price_ntile": relational.order_price_ntile,
        "customer_supplier_pagerank": relational.customer_supplier_pagerank,
        "customer_supplier_pagerank_pinned":
            relational.customer_supplier_pagerank_pinned,
        "user_event_pivot": relational.user_event_pivot,
        "prev_order_gap": relational.prev_order_gap,
        "running_revenue": relational.running_revenue,
        "cohort_retention": relational.cohort_retention,
        "unpivot_user_events": relational.unpivot_user_events,
        "approx_distinct_users": approx_distinct_users,
        "events_quantiles_approx": events_quantiles_approx,
        "heavy_hitter_events": heavy_hitter_events,
        "sample_documents": sample_documents,
        "split_documents": split_documents,
        "shuffle_documents": shuffle_documents,
        "stratified_sample_documents": stratified_sample_documents,
        "decontaminate_split": decontaminate_split,
        "chunk_documents": text.chunk_documents,
        # GPT-3-style n-gram overlap decontamination (partial-leakage check)
        "ngram_decontaminate": ngram_decontaminate,
        "mix_rebalanced_documents": mix_rebalanced_documents,
        "user_daily_activity": relational.user_daily_activity,
        "partitioned_roundtrip": q_partitioned_roundtrip,
        "jsonl_roundtrip": q_jsonl_roundtrip,
        "csv_roundtrip": q_csv_roundtrip,
        # dedup family
        "exact_dedup": dedup.exact_dedup,
        "ngram_jaccard_pairs": dedup.ngram_jaccard_pairs,
        "minhash_lsh_pairs": dedup.minhash_lsh_pairs,
        "winnow_dup_pairs": dedup.winnow_dup_pairs,
        "edit_dup_pairs": dedup.edit_dup_pairs,
        "dedup_clusters": dedup.dedup_clusters,
        "dedup_keep_best": dedup.dedup_keep_best,
        "simhash_pairs": dedup.simhash_pairs,
        "embedding_dup_pairs": dedup.embedding_dup_pairs,
        "semantic_dedup": dedup.semantic_dedup,
        "bm25_topk": text.bm25_topk,
        "bm25_topk_indexed": text.bm25_topk_indexed,
        "hybrid_topk_rrf": text.hybrid_topk_rrf,
        "dsir_weights": text.dsir_weights,
        "ngram_diversity": text.ngram_diversity,
        "lang_confusion": text.lang_confusion,
        "quality_percentile_filter": text.quality_percentile_filter,
        # similarity search
        "ann_topk": similarity.ann_topk,
        "ann_topk_lsh": similarity.ann_topk_lsh,
        "ann_topk_ivf": similarity.ann_topk_ivf,
        "ann_topk_ivf_clustered": similarity.ann_topk_ivf_clustered,
        # product quantization (Jégou et al. 2011): rows-only like IVF (the
        # k-means codebook is not SQL-expressible); recall + artifact-size
        # evidence in BASELINE.md, golden-tested in tests/test_pipelines.py
        "ann_topk_pq": similarity.ann_topk_pq,
        "ann_topk_pq_indexed": similarity.ann_topk_pq_indexed,
        "label_centroids": similarity.label_centroids,
        "kmeans_embeddings": similarity.kmeans_embeddings,
        # text analysis
        "text_stats": text.text_stats,
        "token_counts": text.token_counts,
        "quality_filter": text.quality_filter,
        "top_bigrams": text.top_bigrams,
        "token_cooccurrence": text.token_cooccurrence,
        "bpe_pair_counts": text.bpe_pair_counts,
        "zipf_slope": text.zipf_slope,
        "rarest_terms": text.rarest_terms,
        "tfidf_top_terms": text.tfidf_top_terms,
        "unigram_surprisal": text.unigram_surprisal,
        "vocab_top_tokens": text.vocab_top_tokens,
        "tokenize_docs": text.tokenize_docs,
        "contamination_flags": text.contamination_flags,
        "bag_dedup": text.bag_dedup,
        "json_extract_events": text.json_extract_events,
        "source_mix_weights": text.source_mix_weights,
        "doc_length_buckets": text.doc_length_buckets,
        "conversation_docs": lambda sf: text.flatten_conversations(
            _transcripts(sf)),
        "pack_sequences": text.pack_sequences,
        "fingerprints": lambda sf: text.fingerprints(sf).select_columns(
            ["doc_id", "fingerprint"]),
        "winnow_fingerprints": text.fingerprints,
        # multimodal plumbing
        "multimodal_features": lambda sf: multimodal.multimodal_features(sf)
        .select_columns(["doc_id", "n_bytes", "checksum", "width", "height"]),
        "multimodal_frames": lambda sf: multimodal.multimodal_frames(sf)
        .select_columns(["doc_id", "frame_idx", "frame_len"]),
        # REAL binary decode (int16 PCM view) — non-SQL, numpy-golden-tested
        "audio_window_energy": multimodal.audio_window_energy,
        # REAL image decode (pure-numpy PPM/BMP): the geometry projection is
        # SQL-oracle-able because the synthetic payload dims are id-derived —
        # the oracle verifies encode→decode recovered the true (w, h)
        "image_features": lambda sf: multimodal.image_features(sf)
        .select_columns(["doc_id", "width", "height"]),
        "image_resized_features": lambda sf:
        multimodal.image_resized_features(sf)
        .select_columns(["doc_id", "width", "height"]),
    }


TOKENS_SQL = "list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '')"

BIGRAMS_SQL = (
    "list_distinct(CASE WHEN len(toks) < 2 THEN [] "
    "ELSE list_transform(generate_series(1, len(toks) - 1), "
    "i -> toks[i] || ' ' || toks[i + 1]) END)"
)


def _minhash_ctes(threshold: float = 0.5) -> tuple[str, str]:
    """The MinHash-LSH replay as (CTE list, final pair select) so callers can
    splice it into a larger WITH clause (``_clusters_sql`` adds a recursive
    closure on top; DuckDB rejects a nested WITH inside a CTE body when the
    body is a UNION)."""
    from .dedup import MINHASH_M, MINHASH_P, N_BANDS, N_HASHES, _minhash_params

    a, b = _minhash_params()
    rows_per_band = N_HASHES // N_BANDS
    if rows_per_band != 4:  # the Horner fold below is written for 4 rows
        raise ValueError("minhash oracle SQL requires N_HASHES == 4 * N_BANDS")
    params = ", ".join(f"({i}, {int(a[i])}, {int(b[i])})" for i in range(N_HASHES))
    p, m = MINHASH_P, MINHASH_M
    ctes = f"""
        toksed AS (SELECT doc_id, {TOKENS_SQL} AS toks FROM documents),
        sh AS (SELECT doc_id, {BIGRAMS_SQL} AS grams FROM toksed),
        gx AS (SELECT doc_id, unnest(grams) AS gram FROM sh),
        hx AS (SELECT doc_id,
                      ('0x' || substring(md5(gram), 1, 8))::BIGINT % {p} AS x
               FROM gx),
        par AS (SELECT * FROM (VALUES {params}) AS t(i, a, b)),
        mins AS (SELECT doc_id, i, min((a * x + b) % {p}) AS mh
                 FROM hx CROSS JOIN par GROUP BY doc_id, i),
        bandrows AS (SELECT doc_id, i // {rows_per_band} AS band_id,
                            list(mh ORDER BY i) AS l
                     FROM mins GROUP BY doc_id, i // {rows_per_band}),
        bh AS (SELECT doc_id, band_id,
                      ((((l[1] * {m} + l[2]) % {p}) * {m} + l[3]) % {p}
                       * {m} + l[4]) % {p} AS band_hash
               FROM bandrows),
        cand AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
                 FROM bh x JOIN bh y
                   ON x.band_id = y.band_id AND x.band_hash = y.band_hash
                      AND x.doc_id < y.doc_id),
        verified AS (
            SELECT c.doc_a, c.doc_b,
                   round(CASE WHEN len(list_distinct(list_concat(x.grams, y.grams))) = 0
                              THEN 1.0
                              ELSE CAST(len(list_intersect(x.grams, y.grams)) AS DOUBLE)
                                   / len(list_distinct(list_concat(x.grams, y.grams))) END,
                         6) AS jaccard
            FROM cand c
            JOIN sh x ON x.doc_id = c.doc_a
            JOIN sh y ON y.doc_id = c.doc_b),
        empties AS (SELECT doc_id FROM sh WHERE len(grams) = 0)"""
    final = f"""
        SELECT doc_a, doc_b, jaccard FROM verified WHERE jaccard >= {threshold}
        UNION
        SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, 1.0 AS jaccard
        FROM empties x JOIN empties y ON x.doc_id < y.doc_id"""
    return ctes, final


def _minhash_sql(threshold: float = 0.5) -> str:
    """DuckDB replay of the FULL MinHash-LSH pipeline: identical md5-prefix
    shingle hashes, identical (a·x+b) mod 2^31-1 signatures (the constants
    are embedded literally — they are data-independent functions of the
    seed), identical Horner band hashes, the same bucket-candidate set and
    the same exact-Jaccard verification.  Everything stays below 2^62 so
    DuckDB's overflow-checked BIGINT arithmetic never trips."""
    ctes, final = _minhash_ctes(threshold)
    return f"WITH {ctes} {final}"


def _simhash_sql(max_hamming: int = 3) -> str:
    """DuckDB replay of the SimHash pipeline: md5-prefix 64-bit token hashes,
    ±1 bit votes over ALL token occurrences, 4×16-bit band blocking, Hamming
    via ``bit_count(xor(...))`` — bit-identical to pipelines.dedup.SimHasher
    (UBIGINT arithmetic end to end; the signature never reaches the output,
    so no signed overflow at the boundary)."""
    return f"""
        WITH tok AS (SELECT doc_id, unnest({TOKENS_SQL}) AS t FROM documents),
        th AS (SELECT doc_id, ('0x' || substring(md5(t), 1, 16))::UBIGINT AS h
               FROM tok),
        bits AS (SELECT doc_id, j,
                        CASE WHEN (h >> j) & 1 = 1 THEN 1 ELSE -1 END AS v
                 FROM th CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS j)),
        votes AS (SELECT doc_id, j, sum(v) AS s FROM bits GROUP BY doc_id, j),
        sig0 AS (SELECT doc_id,
                        CAST(bit_or(CASE WHEN s > 0 THEN 1::UBIGINT << j
                                         ELSE 0::UBIGINT END) AS UBIGINT) AS sh
                 FROM votes GROUP BY doc_id),
        sig AS (SELECT d.doc_id, coalesce(s.sh, 0::UBIGINT) AS sh
                FROM documents d LEFT JOIN sig0 s ON s.doc_id = d.doc_id),
        bands AS (SELECT doc_id, sh, band_id,
                         (sh >> (band_id * 16)) & 65535 AS band_key
                  FROM sig CROSS JOIN
                       (SELECT unnest(generate_series(0, 3)) AS band_id)),
        cand AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b,
                        x.sh AS sa, y.sh AS sb
                 FROM bands x JOIN bands y
                   ON x.band_id = y.band_id AND x.band_key = y.band_key
                      AND x.doc_id < y.doc_id)
        SELECT doc_a, doc_b, CAST(bit_count(xor(sa, sb)) AS BIGINT) AS hamming
        FROM cand WHERE bit_count(xor(sa, sb)) <= {max_hamming}"""


def _ann_lsh_sql(n_queries: int = 10, k: int = 5, n_planes: int = 10,
                 n_tables: int = 16, max_hamming: int = 1,
                 dim: int = 64) -> str:
    """DuckDB replay of multi-table multiprobe hyperplane-LSH ANN: the
    random hyperplanes are data-independent functions of the seed, embedded
    as DOUBLE[] literals (full-precision repr round-trips to identical
    doubles); per-table bucket keys are sign bits of the embedding·plane
    dot products exactly as similarity.MultiLSH computes them, and the
    multiprobe acceptance is a Hamming-ball test
    ``bit_count(xor(corpus_key, query_key)) <= max_hamming`` in ANY table.
    dim=64 matches the testdata embeddings schema."""
    from .similarity import MultiLSH

    h = MultiLSH(dim=dim, n_planes=n_planes, n_tables=n_tables).h
    rows = ", ".join(
        f"({t}, {j}, [{', '.join(repr(float(v)) for v in h[t][:, j])}]::DOUBLE[])"
        for t in range(n_tables) for j in range(n_planes))
    return f"""
        WITH ed AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
                    FROM embeddings),
        planes AS (SELECT * FROM (VALUES {rows}) AS p(t, j, hp)),
        keys AS (SELECT vec_id, t,
                        CAST(sum(CASE WHEN list_dot_product(emb, hp) > 0
                                 THEN (1 << j) ELSE 0 END) AS BIGINT) AS bucket
                 FROM ed CROSS JOIN planes GROUP BY vec_id, t),
        q AS (SELECT vec_id AS query_id, emb AS qe
              FROM ed ORDER BY vec_id LIMIT {n_queries}),
        qk AS (SELECT q.query_id, kk.t, kk.bucket
               FROM q JOIN keys kk ON kk.vec_id = q.query_id),
        cand AS (SELECT DISTINCT qk.query_id, kk.vec_id
                 FROM qk JOIN keys kk
                   ON kk.t = qk.t
                  AND bit_count(xor(kk.bucket, qk.bucket)) <= {max_hamming}
                 WHERE kk.vec_id <> qk.query_id)
        SELECT c.query_id, c.vec_id,
               round(list_cosine_similarity(q.qe, e.emb), 4) AS cos_sim
        FROM cand c JOIN q ON q.query_id = c.query_id
                    JOIN ed e ON e.vec_id = c.vec_id
        QUALIFY row_number() OVER (
            PARTITION BY c.query_id
            ORDER BY list_cosine_similarity(q.qe, e.emb) DESC, c.vec_id ASC) <= {k}"""


def _emb_sample_ctes(sample_n: int, seed: int = 42) -> str:
    """Shared CTE prefix for the IVF/PQ training replays: normalized
    DOUBLE[] embeddings (``nv``), the md5-hash-ordered training sample
    rounded to 9 dp (``samp``, with its hash rank ``rn``) — bit-identical
    to :func:`..pipelines.similarity._sample_embeddings` (md5 prefix of
    ``"{vec_id}:{seed}"``, global ``sample_n`` smallest by (hash, vec_id),
    L2-normalize, round 9)."""
    return f"""
        ed AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb0
               FROM embeddings),
        n1 AS (SELECT vec_id, emb0,
                      CASE WHEN sqrt(list_dot_product(emb0, emb0)) = 0
                           THEN 1.0
                           ELSE sqrt(list_dot_product(emb0, emb0)) END AS nr
               FROM ed),
        nv AS MATERIALIZED (SELECT vec_id, list_transform(emb0, x -> x / nr) AS emb
               FROM n1),
        sh AS (SELECT vec_id, emb,
                      ('0x' || substring(md5(CAST(vec_id AS VARCHAR)
                                             || ':{seed}'), 1, 16))::UBIGINT
                          AS h
               FROM nv),
        samp AS MATERIALIZED (SELECT vec_id,
                        list_transform(emb, x -> round(x, 9)) AS emb,
                        row_number() OVER (ORDER BY h, vec_id) AS rn
                 FROM sh QUALIFY rn <= {sample_n})"""


def _ivf_sql(n_queries: int = 10, k: int = 5, n_lists: int = 16,
             nprobe: int = 4, iters: int = 10, sample_n: int = 512,
             dim: int = 64) -> str:
    """DuckDB replay of the FULL IVF pipeline, training included: the
    spherical k-means in :class:`..pipelines.similarity.IVFIndex` is a
    deterministic fixed-point computation (hash-order initial centroids,
    9-dp rounding of every assignment score and centroid update), so the
    oracle unrolls the ``iters`` Lloyd iterations as CTE stages and lands
    on bit-identical centroids, probes, cluster assignments and top-k.
    Serves BOTH ann_topk_ivf and ann_topk_ivf_clustered (the clustered
    layout is identical by construction — same centroids, same scoring,
    different physical read)."""
    steps = []
    prev = "c0"
    for i in range(1, iters + 1):
        steps.append(f"""
        a{i} AS MATERIALIZED (SELECT s.vec_id, s.emb, c.c
                 FROM samp s CROSS JOIN {prev} c
                 QUALIFY row_number() OVER (
                     PARTITION BY s.vec_id
                     ORDER BY round(list_dot_product(s.emb, c.vec), 9) DESC,
                              c.c) = 1),
        m{i} AS (SELECT a.c, d.j, avg(a.emb[d.j]) AS v
                 FROM a{i} a CROSS JOIN dims d GROUP BY a.c, d.j),
        mm{i} AS (SELECT c, list(v ORDER BY j) AS mv FROM m{i} GROUP BY c),
        mn{i} AS (SELECT c, mv, sqrt(list_dot_product(mv, mv)) AS nr
                  FROM mm{i}),
        c{i} AS MATERIALIZED (SELECT p.c,
                        CASE WHEN mn.nr IS NULL OR mn.nr = 0 THEN p.vec
                             ELSE list_transform(mn.mv,
                                                 x -> round(x / mn.nr, 9))
                        END AS vec
                 FROM {prev} p LEFT JOIN mn{i} mn ON mn.c = p.c)""")
        prev = f"c{i}"
    return f"""
        WITH {_emb_sample_ctes(sample_n)},
        dims AS (SELECT unnest(generate_series(1, {dim})) AS j),
        c0 AS (SELECT rn - 1 AS c, emb AS vec FROM samp
               WHERE rn <= {n_lists}),
        {",".join(steps)},
        q AS (SELECT vec_id AS query_id, emb AS qe FROM nv
              ORDER BY vec_id LIMIT {n_queries}),
        pr AS (SELECT q.query_id, c.c
               FROM q CROSS JOIN {prev} c
               QUALIFY row_number() OVER (
                   PARTITION BY q.query_id
                   ORDER BY round(list_dot_product(q.qe, c.vec), 9) DESC,
                            c.c) <= {nprobe}),
        asg AS (SELECT v.vec_id, v.emb, c.c
                FROM nv v CROSS JOIN {prev} c
                QUALIFY row_number() OVER (
                    PARTITION BY v.vec_id
                    ORDER BY round(list_dot_product(v.emb, c.vec), 9) DESC,
                             c.c) = 1),
        cand AS (SELECT p.query_id, a.vec_id, a.emb
                 FROM pr p JOIN asg a ON a.c = p.c
                 WHERE a.vec_id <> p.query_id)
        SELECT c.query_id, c.vec_id,
               round(list_dot_product(q.qe, c.emb), 4) AS cos_sim
        FROM cand c JOIN q ON q.query_id = c.query_id
        QUALIFY row_number() OVER (
            PARTITION BY c.query_id
            ORDER BY list_dot_product(q.qe, c.emb) DESC, c.vec_id) <= {k}"""


def _pq_sql(n_queries: int = 10, k: int = 5, m_sub: int = 8,
            k_codes: int = 256, rerank: int = 20, iters: int = 10,
            sample_n: int = 2048, dim: int = 64) -> str:
    """DuckDB replay of the FULL PQ(ADC)+rerank pipeline, codebook training
    included: per-subspace Lloyd k-means on the hash-ordered sample
    (:class:`..pipelines.similarity.PQCodebook` — hash-order initial
    centroids, the |c|^2 − 2 x·c distance proxy rounded to 9 dp with ties
    to the lowest code, means rounded to 9 dp), corpus codes by the same
    proxy, approx scores as Σ_s q_s·C[s, code_s] rounded to 9 dp, the
    global top-``max(k, rerank)`` candidates per query, and the exact
    cosine re-rank.  Serves BOTH ann_topk_pq and ann_topk_pq_indexed
    (identical by construction: same codebook, same candidates, shared
    exact re-scorer)."""
    dsub = dim // m_sub
    take_n = max(k, rerank)
    steps = []
    prev = "p0"
    for i in range(1, iters + 1):
        steps.append(f"""
        pa{i} AS MATERIALIZED (SELECT x.vec_id, x.s, x.sub, c.c
                  FROM ss x JOIN {prev} c ON c.s = x.s
                  QUALIFY row_number() OVER (
                      PARTITION BY x.s, x.vec_id
                      ORDER BY round(list_dot_product(c.vec, c.vec)
                                     - 2 * list_dot_product(x.sub, c.vec),
                                     9) ASC, c.c) = 1),
        pm{i} AS (SELECT a.s, a.c, d.j, avg(a.sub[d.j]) AS v
                  FROM pa{i} a CROSS JOIN sdims d GROUP BY a.s, a.c, d.j),
        pl{i} AS (SELECT s, c, list(round(v, 9) ORDER BY j) AS mv
                  FROM pm{i} GROUP BY s, c),
        p{i} AS MATERIALIZED (SELECT p.s, p.c, coalesce(l.mv, p.vec) AS vec
                 FROM {prev} p LEFT JOIN pl{i} l
                   ON l.s = p.s AND l.c = p.c)""")
        prev = f"p{i}"
    return f"""
        WITH {_emb_sample_ctes(sample_n)},
        subs AS (SELECT unnest(generate_series(0, {m_sub - 1})) AS s),
        sdims AS (SELECT unnest(generate_series(1, {dsub})) AS j),
        ss AS MATERIALIZED (SELECT p.rn, p.vec_id, s.s,
                      p.emb[s.s * {dsub} + 1 : s.s * {dsub} + {dsub}] AS sub
               FROM samp p CROSS JOIN subs s),
        p0 AS (SELECT s, rn - 1 AS c, sub AS vec FROM ss
               WHERE rn <= {k_codes}),
        {",".join(steps)},
        cs AS (SELECT v.vec_id, s.s,
                      v.emb[s.s * {dsub} + 1 : s.s * {dsub} + {dsub}] AS sub
               FROM nv v CROSS JOIN subs s),
        codes AS MATERIALIZED (SELECT x.vec_id, x.s, c.vec
                  FROM cs x JOIN {prev} c ON c.s = x.s
                  QUALIFY row_number() OVER (
                      PARTITION BY x.s, x.vec_id
                      ORDER BY round(list_dot_product(c.vec, c.vec)
                                     - 2 * list_dot_product(x.sub, c.vec),
                                     9) ASC, c.c) = 1),
        q AS (SELECT vec_id AS query_id, emb AS qe FROM nv
              ORDER BY vec_id LIMIT {n_queries}),
        qs AS (SELECT q.query_id, q.qe, s.s,
                      q.qe[s.s * {dsub} + 1 : s.s * {dsub} + {dsub}] AS qsub
               FROM q CROSS JOIN subs s),
        approx AS (SELECT qs.query_id, cd.vec_id,
                          round(sum(list_dot_product(qs.qsub, cd.vec)), 9)
                              AS a
                   FROM qs JOIN codes cd ON cd.s = qs.s
                   GROUP BY qs.query_id, cd.vec_id),
        cand AS (SELECT query_id, vec_id FROM approx
                 WHERE vec_id <> query_id
                 QUALIFY row_number() OVER (
                     PARTITION BY query_id
                     ORDER BY a DESC, vec_id) <= {take_n})
        SELECT c.query_id, c.vec_id,
               round(list_dot_product(q.qe, v.emb), 4) AS score
        FROM cand c JOIN q ON q.query_id = c.query_id
                    JOIN nv v ON v.vec_id = c.vec_id
        QUALIFY row_number() OVER (
            PARTITION BY c.query_id
            ORDER BY list_dot_product(q.qe, v.emb) DESC, c.vec_id) <= {k}"""


def _keep_best_sql(threshold: float = 0.5) -> str:
    """Cluster closure + quality keep rule: per cluster the member with the
    most whitespace tokens (ties -> lowest doc_id)."""
    ctes, final = _minhash_ctes(threshold)
    return f"""
        WITH RECURSIVE {ctes},
        pairs AS ({final}),
        nodes AS (SELECT doc_a AS node FROM pairs
                  UNION SELECT doc_b FROM pairs),
        edges AS (SELECT doc_a AS u, doc_b AS v FROM pairs
                  UNION SELECT doc_b, doc_a FROM pairs),
        reach(node, lab) AS (
            SELECT node, node FROM nodes
            UNION
            SELECT e.v, r.lab FROM reach r JOIN edges e ON e.u = r.node),
        clusters AS (SELECT node AS doc_id, min(lab) AS rep_id
                     FROM reach GROUP BY node),
        tok AS (SELECT doc_id,
                       CAST(len({TOKENS_SQL}) AS BIGINT) AS ws
                FROM documents),
        scored AS (SELECT c.rep_id, c.doc_id, t.ws
                   FROM clusters c JOIN tok t USING (doc_id))
        SELECT rep_id, kept_doc_id, n_members, kept_ws_tokens FROM (
            SELECT rep_id, doc_id AS kept_doc_id, ws AS kept_ws_tokens,
                   count(*) OVER (PARTITION BY rep_id) AS n_members,
                   row_number() OVER (PARTITION BY rep_id
                                      ORDER BY ws DESC, doc_id) AS rn
            FROM scored)
        WHERE rn = 1 ORDER BY rep_id"""


def _prepared_sql(threshold: float = 0.5) -> str:
    """Full composition oracle: MinHash replay + recursive closure +
    quality keep-best drop set, intersected with the curate (quality +
    exact-dedup) survivors."""
    from .curate import (QUALITY_MAX_MWL, QUALITY_MAX_WORDS,
                         QUALITY_MIN_DISTINCT_RATIO, QUALITY_MIN_MWL,
                         QUALITY_MIN_WORDS)

    ctes, final = _minhash_ctes(threshold)
    return f"""
        WITH RECURSIVE {ctes},
        pairs AS ({final}),
        nodes AS (SELECT doc_a AS node FROM pairs
                  UNION SELECT doc_b FROM pairs),
        edges AS (SELECT doc_a AS u, doc_b AS v FROM pairs
                  UNION SELECT doc_b, doc_a FROM pairs),
        reach(node, lab) AS (
            SELECT node, node FROM nodes
            UNION
            SELECT e.v, r.lab FROM reach r JOIN edges e ON e.u = r.node),
        clusters AS (SELECT node AS doc_id, min(lab) AS rep_id
                     FROM reach GROUP BY node),
        wtok AS (SELECT doc_id, CAST(len({TOKENS_SQL}) AS BIGINT) AS ws
                 FROM documents),
        scoredkb AS (SELECT c.rep_id, c.doc_id, w.ws
                     FROM clusters c JOIN wtok w USING (doc_id)),
        kept_best AS (SELECT kept_doc_id FROM (
            SELECT doc_id AS kept_doc_id,
                   row_number() OVER (PARTITION BY rep_id
                                      ORDER BY ws DESC, doc_id) AS rn
            FROM scoredkb) WHERE rn = 1),
        drop_ids AS (SELECT doc_id FROM clusters
                     WHERE doc_id NOT IN (SELECT kept_doc_id
                                          FROM kept_best)),
        ct AS (SELECT doc_id, coalesce(text, '') AS txt,
                      {TOKENS_SQL} AS toks
               FROM documents),
        cs AS (SELECT doc_id, txt, len(toks) AS n,
                      len(list_distinct(toks)) AS nd,
                      coalesce(list_sum(list_transform(toks,
                          x -> length(x))), 0) AS lensum,
                      len(list_filter(toks,
                          x -> x IN ('the','and','of','a','to','in')))
                          AS stop
               FROM ct),
        qkept AS (SELECT doc_id, txt, n FROM cs
                  WHERE n >= {QUALITY_MIN_WORDS} AND n <= {QUALITY_MAX_WORDS}
                    AND CAST(lensum AS DOUBLE) / n >= {QUALITY_MIN_MWL}
                    AND CAST(lensum AS DOUBLE) / n <= {QUALITY_MAX_MWL}
                    AND stop > 0
                    AND CAST(nd AS DOUBLE) / n
                        >= {QUALITY_MIN_DISTINCT_RATIO}),
        curated AS (SELECT min(doc_id) AS doc_id,
                           CAST(min(n) AS BIGINT) AS n_tokens
                    FROM qkept GROUP BY txt)
        SELECT doc_id, n_tokens FROM curated
        WHERE doc_id NOT IN (SELECT doc_id FROM drop_ids)"""


def _clusters_sql(threshold: float = 0.5) -> str:
    """MinHash pair replay + recursive-CTE reachability closure: each node's
    rep is the min label reachable through the near-dup pair graph —
    SQL-exact vs the engine's hash-to-min connected components."""
    ctes, final = _minhash_ctes(threshold)
    return f"""
        WITH RECURSIVE {ctes},
        pairs AS ({final}),
        nodes AS (SELECT doc_a AS node FROM pairs
                  UNION SELECT doc_b FROM pairs),
        edges AS (SELECT doc_a AS u, doc_b AS v FROM pairs
                  UNION SELECT doc_b, doc_a FROM pairs),
        reach(node, lab) AS (
            SELECT node, node FROM nodes
            UNION
            SELECT e.v, r.lab FROM reach r JOIN edges e ON e.u = r.node)
        SELECT node AS doc_id, min(lab) AS rep_id FROM reach GROUP BY node"""


def oracle_sql() -> dict:
    t = f"WITH {TRANSCRIPTS_CTE}"
    return {
        "transcripts": f"{t} SELECT conv_id, turn_idx, role, text, tool, ts FROM transcripts",
        "scrub_docs": f"""
            SELECT doc_id,
                   replace(replace(text, '{DOC_NAME_PATTERN}', ''),
                           '{DOC_FOOTER_PATTERN}', '') AS text,
                   (text LIKE '%{DOC_NAME_PATTERN}%' OR text LIKE '%{DOC_FOOTER_PATTERN}%')
                       AS modified
            FROM documents""",
        "scrub_docs_footer_off": f"""
            SELECT doc_id,
                   replace(text, '{DOC_NAME_PATTERN}', '') AS text,
                   (text LIKE '%{DOC_NAME_PATTERN}%') AS modified
            FROM documents""",
        "transcript_summary": f"""{t}
            SELECT count(*) AS n_turns, count(DISTINCT conv_id) AS n_convs
            FROM transcripts""",
        "tumbling_counts": f"""{t}
            SELECT conv_id, (epoch_us(ts) // {SIZE_US}) * {SIZE_US} AS window_start_us,
                   count(*) AS n_turns
            FROM transcripts GROUP BY 1, 2""",
        "sliding_counts": f"""{t}
            SELECT conv_id,
                   ((epoch_us(ts) // {SLIDE_US}) - off) * {SLIDE_US} AS window_start_us,
                   count(*) AS n_turns
            FROM transcripts,
                 (SELECT unnest(generate_series(0, {SIZE_US // SLIDE_US - 1})) AS off)
            WHERE ((epoch_us(ts) // {SLIDE_US}) - off) * {SLIDE_US} > epoch_us(ts) - {SIZE_US}
            GROUP BY 1, 2""",
        "session_windows": f"""{t},
            flagged AS (
                SELECT conv_id, epoch_us(ts) AS ts_us,
                       CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
                            OVER (PARTITION BY conv_id ORDER BY ts, turn_idx) > {GAP_US}
                            THEN 1 ELSE 0 END AS brk
                FROM transcripts),
            sess AS (
                SELECT conv_id, ts_us,
                       sum(brk) OVER (PARTITION BY conv_id ORDER BY ts_us
                                      ROWS UNBOUNDED PRECEDING) AS sid
                FROM flagged)
            SELECT conv_id, min(ts_us) AS session_start_us, max(ts_us) AS session_end_us,
                   count(*) AS n_turns
            FROM sess GROUP BY conv_id, sid""",
        "stream_join": f"""{t}
            SELECT tt.conv_id, u.turn_idx AS user_turn_idx, tt.turn_idx AS tool_turn_idx,
                   tt.tool, epoch_us(tt.ts) - epoch_us(u.ts) AS dt_us
            FROM (SELECT * FROM transcripts WHERE role = 'tool') tt
            JOIN (SELECT * FROM transcripts WHERE role = 'user') u USING (conv_id)
            WHERE u.ts <= tt.ts AND epoch_us(tt.ts) - epoch_us(u.ts) <= {GAP_US}
            QUALIFY row_number() OVER (PARTITION BY tt.conv_id, tt.turn_idx
                                       ORDER BY u.ts DESC, u.turn_idx DESC) = 1""",
        "tool_latency_quantiles": f"""{t},
            m AS (
                SELECT tt.conv_id, tt.tool,
                       epoch_us(tt.ts) - epoch_us(u.ts) AS dt_us
                FROM (SELECT * FROM transcripts WHERE role = 'tool') tt
                JOIN (SELECT * FROM transcripts WHERE role = 'user') u
                     USING (conv_id)
                WHERE u.ts <= tt.ts AND epoch_us(tt.ts) - epoch_us(u.ts) <= {GAP_US}
                QUALIFY row_number() OVER (PARTITION BY tt.conv_id, tt.turn_idx
                                           ORDER BY u.ts DESC, u.turn_idx DESC) = 1)
            SELECT tool, quantile_disc(dt_us, 0.5) AS p50_dt_us,
                   quantile_disc(dt_us, 0.95) AS p95_dt_us, count(*) AS n
            FROM m GROUP BY tool""",
        "range_join": f"""{t}
            SELECT tt.conv_id, u.turn_idx AS user_turn_idx,
                   tt.turn_idx AS tool_turn_idx, tt.tool,
                   epoch_us(tt.ts) - epoch_us(u.ts) AS dt_us
            FROM (SELECT * FROM transcripts WHERE role = 'tool') tt
            JOIN (SELECT * FROM transcripts WHERE role = 'user') u USING (conv_id)
            WHERE u.ts <= tt.ts
              AND epoch_us(tt.ts) - epoch_us(u.ts) <= {GAP_US}""",
        # two-table as-of: max order date <= event ts, ties to max orderkey
        # (the engine's merge_asof last-row-in-(ts, tie)-sort-order rule)
        "events_orders_asof": """
            SELECT e.user_id, e.event_id, o.o_orderkey,
                   epoch_us(e.ts) - epoch_us(o.o_orderdate) AS lag_us
            FROM events e JOIN orders o ON e.user_id = o.o_custkey
            WHERE o.o_orderdate <= e.ts
            QUALIFY row_number() OVER (
                PARTITION BY e.event_id
                ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) = 1""",
        # forward as-of: min event ts >= order date, ties to MIN event_id
        # (merge_asof first-row-in-(ts, tie)-sort-order rule)
        "orders_events_asof_fwd": """
            SELECT o.o_custkey AS user_id, o.o_orderkey, e.event_id,
                   epoch_us(e.ts) - epoch_us(o.o_orderdate) AS lag_us
            FROM orders o JOIN events e ON e.user_id = o.o_custkey
            WHERE e.ts >= o.o_orderdate
            QUALIFY row_number() OVER (
                PARTITION BY o.o_orderkey
                ORDER BY e.ts ASC, e.event_id ASC) = 1""",
        "session_labels": f"""{t},
            flagged AS (
                SELECT conv_id, turn_idx, ts,
                       CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
                            OVER (PARTITION BY conv_id ORDER BY ts, turn_idx)
                            > {GAP_US} THEN 1 ELSE 0 END AS brk
                FROM transcripts)
            SELECT conv_id, turn_idx,
                   CAST(sum(brk) OVER (
                       PARTITION BY conv_id ORDER BY ts, turn_idx
                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
            FROM flagged""",
        # dt_us = span (greatest - least over the 3 turns), the engine's
        # non-monotone-safe rule; equals lead(ts,2)-ts on this (monotone) data
        "cep_funnel": f"""{t},
            w AS (
                SELECT conv_id, turn_idx, role, ts,
                       lead(role, 1) OVER win AS r1,
                       lead(role, 2) OVER win AS r2,
                       lead(ts, 1) OVER win AS ts1,
                       lead(ts, 2) OVER win AS ts2
                FROM transcripts
                WINDOW win AS (PARTITION BY conv_id ORDER BY turn_idx))
            SELECT conv_id, turn_idx,
                   greatest(epoch_us(ts), epoch_us(ts1), epoch_us(ts2))
                   - least(epoch_us(ts), epoch_us(ts1), epoch_us(ts2)) AS dt_us
            FROM w
            WHERE role = '{CEP_PATTERN[0]}' AND r1 = '{CEP_PATTERN[1]}'
              AND r2 = '{CEP_PATTERN[2]}'
              AND greatest(epoch_us(ts), epoch_us(ts1), epoch_us(ts2))
                  - least(epoch_us(ts), epoch_us(ts1), epoch_us(ts2))
                  <= {CEP_WITHIN_US}""",
        "dup_spans": dedup.dup_spans_oracle_sql(),
        "curate_corpus": _curate.curate_corpus_oracle_sql(TOKENS_SQL),
        "prepared_corpus": _prepared_sql(threshold=0.5),
        "dedup_turns": text.dedup_turns_oracle_sql(TRANSCRIPTS_CTE),
        "collapse_repeat_turns":
            text.collapse_repeats_oracle_sql(TRANSCRIPTS_CTE),
        "pii_redacted_turns": text.pii_redact_oracle_sql(TRANSCRIPTS_CTE),
        "repetition_scores": text.repetition_scores_oracle_sql(),
        "token_entropy": text.token_entropy_oracle_sql(),
        "normalized_docs": text.normalize_docs_oracle_sql(),
        "cms_user_counts": cms_oracle_sql(),
        "user_activity_outer": relational.user_activity_outer_oracle_sql(),
        "capped_sample_per_group": capped_sample_oracle_sql(),
        "weighted_sample_documents": weighted_sample_oracle_sql(),
        "events_window_distinct":
            relational.events_window_distinct_oracle_sql(),
        "user_daily_locf": relational.user_daily_locf_oracle_sql(),
        "order_percent_rank": relational.order_percent_rank_oracle_sql(),
        "top_customers_with_ties":
            relational.top_customers_with_ties_oracle_sql(),
        "orders_yoy_growth": relational.orders_yoy_growth_oracle_sql(),
        # DEFINE-clause generalization: per-slot predicates (text regex on
        # the user slot, tool equality on the tool slot)
        "cep_pred_funnel": f"""{t},
            w AS (
                SELECT conv_id, turn_idx, role, tool, text, ts,
                       lead(role, 1) OVER win AS r1,
                       lead(tool, 1) OVER win AS tool1,
                       lead(role, 2) OVER win AS r2,
                       lead(ts, 1) OVER win AS ts1,
                       lead(ts, 2) OVER win AS ts2
                FROM transcripts
                WINDOW win AS (PARTITION BY conv_id ORDER BY turn_idx))
            SELECT conv_id, turn_idx,
                   greatest(epoch_us(ts), epoch_us(ts1), epoch_us(ts2))
                   - least(epoch_us(ts), epoch_us(ts1), epoch_us(ts2)) AS dt_us
            FROM w
            WHERE role = 'user' AND regexp_matches(text, '{CEP_TEXT_REGEX}')
              AND r1 = 'tool' AND tool1 = 'error' AND r2 = 'assistant'
              AND greatest(epoch_us(ts), epoch_us(ts1), epoch_us(ts2))
                  - least(epoch_us(ts), epoch_us(ts1), epoch_us(ts2))
                  <= {CEP_WITHIN_US}""",
        # non-contiguous A ... B within T: dt_us to the EARLIEST qualifying
        # match (min over qualifying ts — tie-free by construction)
        "cep_followed_by": f"""{t}
            SELECT u.conv_id, u.turn_idx,
                   min(epoch_us(a.ts)) - epoch_us(u.ts) AS dt_us
            FROM transcripts u
            JOIN transcripts a ON a.conv_id = u.conv_id
                 AND a.role = 'tool' AND a.tool = 'purchase'
                 AND a.ts >= u.ts
                 AND epoch_us(a.ts) - epoch_us(u.ts) <= {CEP_WITHIN_US}
            WHERE u.role = 'user'
            GROUP BY u.conv_id, u.turn_idx, u.ts""",
        "cep_tool_bursts": f"""{t},
            g AS (
                SELECT conv_id, turn_idx, role, ts,
                       turn_idx - row_number() OVER (
                           PARTITION BY conv_id, role ORDER BY turn_idx) AS grp
                FROM transcripts),
            runs AS (
                SELECT conv_id, min(turn_idx) AS s, max(turn_idx) AS e,
                       count(*) AS n_tools
                FROM g WHERE role = 'tool' GROUP BY conv_id, grp),
            spans AS (
                SELECT r.conv_id, r.s, r.e, r.n_tools,
                       max(epoch_us(t.ts)) - min(epoch_us(t.ts)) AS dt_us
                FROM runs r
                JOIN g t ON t.conv_id = r.conv_id
                        AND t.turn_idx BETWEEN r.s - 1 AND r.e + 1
                GROUP BY r.conv_id, r.s, r.e, r.n_tools)
            SELECT sp.conv_id, u.turn_idx, sp.n_tools, sp.dt_us
            FROM spans sp
            JOIN g u ON u.conv_id = sp.conv_id AND u.turn_idx = sp.s - 1
                    AND u.role = 'user'
            JOIN g a ON a.conv_id = sp.conv_id AND a.turn_idx = sp.e + 1
                    AND a.role = 'assistant'
            WHERE sp.dt_us <= {CEP_WITHIN_US}""",
        # CEP negation: user turn with NO assistant at-or-after it within the
        # window (time-based, not adjacency-based)
        "cep_timeouts": f"""{t}
            SELECT u.conv_id, u.turn_idx,
                   epoch_us(u.ts) + {CEP_WITHIN_US} AS deadline_us
            FROM transcripts u
            WHERE u.role = 'user' AND NOT EXISTS (
                SELECT 1 FROM transcripts a
                WHERE a.conv_id = u.conv_id AND a.role = 'assistant'
                  AND a.ts >= u.ts
                  AND epoch_us(a.ts) - epoch_us(u.ts) <= {CEP_WITHIN_US})""",
        "late_drops": f"""{t},
            e AS (SELECT *, CAST(((event_id // {SCRAMBLE}) * {SCRAMBLE}
                                  + ({SCRAMBLE} - 1 - event_id % {SCRAMBLE})) // {EPOCH_SIZE}
                            AS INT) AS epoch FROM transcripts),
            em AS (SELECT epoch, max(epoch_us(ts)) AS mx FROM e GROUP BY epoch),
            wm AS (SELECT epoch,
                          max(mx) OVER (ORDER BY epoch ROWS UNBOUNDED PRECEDING)
                          - {LATENESS_US} AS wm_after
                   FROM em)
            SELECT e.conv_id, e.turn_idx, e.epoch
            FROM e JOIN wm ON wm.epoch = e.epoch - 1
            WHERE epoch_us(e.ts) < wm.wm_after""",
        "enriched_turns": f"""{t},
            dim(d_tool, tool_group, tool_weight) AS (
                VALUES ('purchase', 'g0', 0.1), ('error', 'g1', 0.2),
                       ('search', 'g2', 0.3))
            SELECT tr.conv_id, tr.turn_idx, tr.tool,
                   coalesce(dim.tool_group, 'unknown') AS tool_group,
                   coalesce(dim.tool_weight, 0.0) AS tool_weight
            FROM transcripts tr LEFT JOIN dim ON dim.d_tool = tr.tool
            WHERE tr.role = 'tool'""",
        "q1_pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2) AS sum_qty,
                   round(sum(l_extendedprice), 2) AS sum_base_price,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
                   round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
                   round(sum(l_quantity) / count(*), 4) AS avg_qty,
                   round(sum(l_extendedprice) / count(*), 4) AS avg_price,
                   count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1995-09-01'
            GROUP BY l_returnflag, l_linestatus""",
        "q3_top_orders": """
            SELECT o.o_orderkey, o.o_orderdate,
                   round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
            FROM orders o
            JOIN customer c ON c.c_custkey = o.o_custkey AND c.c_mktsegment = 'BUILDING'
            JOIN lineitem l ON l.l_orderkey = o.o_orderkey
            GROUP BY o.o_orderkey, o.o_orderdate
            ORDER BY revenue DESC, o.o_orderkey ASC
            LIMIT 10""",
        "q5_revenue_by_nation": """
            SELECT n.n_name,
                   round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
            FROM lineitem l
            JOIN supplier s ON s.s_suppkey = l.l_suppkey
            JOIN nation n ON n.n_nationkey = s.s_nationkey
            GROUP BY n.n_name""",
        "topk_orders_per_customer": """
            SELECT o_custkey, o_orderkey, o_totalprice
            FROM orders
            QUALIFY row_number() OVER (PARTITION BY o_custkey
                                       ORDER BY o_totalprice DESC, o_orderkey DESC) <= 2""",
        "customers_without_urgent_orders": """
            SELECT c_custkey, c_name FROM customer c
            WHERE NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_custkey = c.c_custkey
                                AND o.o_orderpriority = '1-URGENT')""",
        "customer_order_counts": """
            SELECT c.c_custkey, count(o.o_orderkey) AS n_orders
            FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
            GROUP BY c.c_custkey""",
        "order_priority_counts": """
            SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders
            FROM orders GROUP BY 1, 2""",
        "prev_order_gap": """
            SELECT o_orderkey, o_custkey,
                   CAST(epoch_us(o_orderdate)
                        - lag(epoch_us(o_orderdate)) OVER (
                              PARTITION BY o_custkey
                              ORDER BY o_orderdate, o_orderkey) AS DOUBLE) AS gap_us
            FROM orders""",
        "running_revenue": """
            SELECT o_orderkey, o_custkey,
                   round(sum(o_totalprice) OVER (
                             PARTITION BY o_custkey
                             ORDER BY o_orderdate, o_orderkey
                             ROWS UNBOUNDED PRECEDING), 2) AS running_total
            FROM orders""",
        "events_windowed_stats": """
            SELECT event_type, (epoch_us(ts) // 86400000000) * 86400000000 AS window_start_us,
                   count(*) AS n, round(sum(value), 2) AS sum_value,
                   round(min(value), 2) AS min_value, round(max(value), 2) AS max_value
            FROM events GROUP BY 1, 2""",
        # quantile_disc picks an actual element (sorted index ceil(q·n)−1, no
        # interpolation) — float-order-insensitive, so it hash-matches the
        # engine's distributed value-counts selection exactly
        "events_quantiles": """
            SELECT event_type,
                   quantile_disc(value, 0.5) AS p50_value,
                   quantile_disc(value, 0.75) AS p75_value,
                   quantile_disc(value, 0.95) AS p95_value,
                   count(*) AS n
            FROM events
            WHERE event_type IS NOT NULL AND value IS NOT NULL
            GROUP BY event_type""",
        # quantile_cont: the engine replays DuckDB's interpolation formula
        # with identical IEEE operation order, so doubles match bit-for-bit
        "events_quantiles_cont": """
            SELECT event_type,
                   quantile_cont(value, 0.5) AS c50_value,
                   quantile_cont(value, 0.9) AS c90_value,
                   count(*) AS n
            FROM events
            WHERE event_type IS NOT NULL AND value IS NOT NULL
            GROUP BY event_type""",
        "moving_revenue_sum": """
            SELECT o_orderkey, o_custkey,
                   round(sum(o_totalprice) OVER (
                       PARTITION BY o_custkey
                       ORDER BY o_orderdate, o_orderkey
                       ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 2)
                       AS moving_sum
            FROM orders""",
        "order_priority_rollup": """
            SELECT coalesce(o_orderstatus, 'ALL') AS o_orderstatus,
                   coalesce(o_orderpriority, 'ALL') AS o_orderpriority,
                   count(*) AS n
            FROM orders
            WHERE o_orderstatus IS NOT NULL AND o_orderpriority IS NOT NULL
            GROUP BY ROLLUP (o_orderstatus, o_orderpriority)""",
        "order_priority_cube": """
            SELECT coalesce(o_orderstatus, 'ALL') AS o_orderstatus,
                   coalesce(o_orderpriority, 'ALL') AS o_orderpriority,
                   count(*) AS n
            FROM orders
            WHERE o_orderstatus IS NOT NULL AND o_orderpriority IS NOT NULL
            GROUP BY CUBE (o_orderstatus, o_orderpriority)""",
        "event_user_cube": relational.event_user_cube_oracle_sql(),
        "q7_volume_shipping": relational.q7_volume_shipping_oracle_sql(),
        "q6_forecast_revenue": relational.q6_oracle_sql(),
        "q10_returned_items": relational.q10_oracle_sql(),
        "q14_promo_revenue": relational.q14_oracle_sql(),
        "q17_small_qty_revenue": relational.q17_oracle_sql(),
        "q18_large_orders": relational.q18_oracle_sql(),
        "q19_disjunctive_revenue": relational.q19_oracle_sql(),
        "q4_order_priority": relational.q4_oracle_sql(),
        "q8_market_share": relational.q8_oracle_sql(),
        "q13_custdist": relational.q13_oracle_sql(),
        "q15_top_supplier": relational.q15_oracle_sql(),
        "q21_waiting_suppliers": relational.q21_oracle_sql(),
        "q22_global_sales": relational.q22_oracle_sql(),
        "customers_without_events":
            relational.customers_without_events_oracle_sql(),
        "bloom_semijoin_revenue": relational.bloom_semijoin_oracle_sql(),
        "orders_global_rank": relational.orders_global_rank_oracle_sql(),
        "latest_user_event": relational.latest_user_event_oracle_sql(),
        "lineitem_regression_stats":
            relational.lineitem_regression_stats_oracle_sql(),
        "user_mode_event": relational.user_mode_event_oracle_sql(),
        "event_value_mad": relational.event_value_mad_oracle_sql(),
        "events_zorder_pruned": relational.events_zorder_oracle_sql(),
        "order_price_ntile": relational.order_price_ntile_oracle_sql(),
        "customer_supplier_pagerank":
            relational.customer_supplier_pagerank_oracle_sql(),
        "customer_supplier_pagerank_pinned":
            relational.customer_supplier_pagerank_oracle_sql(),
        "events_range_sum": relational.events_range_sum_oracle_sql(),
        "users_with_events_and_orders":
            relational.users_with_events_and_orders_oracle_sql(),
        "user_event_pivot": """
            SELECT user_id,
                   count(*) FILTER (event_type = 'click') AS n_click,
                   count(*) FILTER (event_type = 'error') AS n_error,
                   count(*) FILTER (event_type = 'purchase') AS n_purchase,
                   count(*) FILTER (event_type = 'signup') AS n_signup,
                   count(*) FILTER (event_type = 'view') AS n_view
            FROM events
            WHERE user_id IS NOT NULL AND event_type IS NOT NULL
            GROUP BY user_id""",
        "cohort_retention": relational.cohort_retention_oracle_sql(),
        "unpivot_user_events": relational.unpivot_oracle_sql(),
        "exact_dedup": """
            SELECT min(doc_id) AS doc_id, count(*) AS n_copies
            FROM documents GROUP BY text""",
        "ngram_jaccard_pairs": f"""
            WITH toksed AS (
                SELECT doc_id, lang, source, {TOKENS_SQL} AS toks FROM documents),
            sh AS (SELECT doc_id, lang, source, {BIGRAMS_SQL} AS grams FROM toksed)
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   round(CASE WHEN len(list_distinct(list_concat(a.grams, b.grams))) = 0
                              THEN 1.0
                              ELSE CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
                                   / len(list_distinct(list_concat(a.grams, b.grams))) END,
                         6) AS jaccard
            FROM sh a JOIN sh b
              ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
            WHERE CASE WHEN len(list_distinct(list_concat(a.grams, b.grams))) = 0 THEN 1.0
                       ELSE CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
                            / len(list_distinct(list_concat(a.grams, b.grams))) END >= 0.2""",
        # CAST to DOUBLE[]: list_cosine_similarity on FLOAT lists computes and
        # returns float32, which can never hash-match a float64 Ray result.
        "embedding_dup_pairs": """
            WITH ed AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb
                        FROM embeddings)
            SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
                   round(list_cosine_similarity(a.emb, b.emb), 4) AS cos_sim
            FROM ed a JOIN ed b
              ON a.label = b.label AND a.vec_id < b.vec_id
            WHERE list_cosine_similarity(a.emb, b.emb) >= 0.30""",
        "label_centroids": similarity.label_centroids_oracle_sql(),
        "kmeans_embeddings": similarity.kmeans_embeddings_oracle_sql(),
        "semantic_dedup": dedup.semantic_dedup_oracle_sql(),
        "bm25_topk": text.bm25_topk_oracle_sql(),
        "bm25_topk_indexed": text.bm25_topk_oracle_sql(),
        "hybrid_topk_rrf": text.hybrid_topk_rrf_oracle_sql(),
        "dsir_weights": text.dsir_weights_oracle_sql(),
        "ngram_diversity": text.ngram_diversity_oracle_sql(),
        "lang_confusion": f"""
            WITH toksed AS (
                SELECT coalesce(lang, '') AS lang, {TOKENS_SQL} AS toks
                FROM documents),
            scored AS (
                SELECT lang,
                       len(list_filter(toks, x -> x IN ('the','and','of'))) AS s_en,
                       len(list_filter(toks, x -> x IN ('der','und','die'))) AS s_de,
                       len(list_filter(toks, x -> x IN ('le','la','et'))) AS s_fr,
                       len(list_filter(toks, x -> x IN ('el','y','los'))) AS s_es
                FROM toksed)
            SELECT lang,
                   CASE WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es
                             AND s_en > 0 THEN 'en'
                        WHEN s_de >= s_fr AND s_de >= s_es AND s_de > 0
                            THEN 'de'
                        WHEN s_fr >= s_es AND s_fr > 0 THEN 'fr'
                        WHEN s_es > 0 THEN 'es'
                        ELSE 'und' END AS lang_pred,
                   count(*) AS n_docs
            FROM scored GROUP BY lang, lang_pred""",
        "quality_percentile_filter":
            text.quality_percentile_filter_oracle_sql(),
        "ann_topk": """
            WITH ed AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
                        FROM embeddings),
            q AS (SELECT vec_id AS query_id, emb AS qe FROM ed ORDER BY vec_id LIMIT 10)
            SELECT q.query_id, e.vec_id,
                   round(list_cosine_similarity(q.qe, e.emb), 4) AS cos_sim
            FROM q, ed e
            WHERE e.vec_id <> q.query_id
            QUALIFY row_number() OVER (
                PARTITION BY q.query_id
                ORDER BY list_cosine_similarity(q.qe, e.emb) DESC, e.vec_id ASC) <= 5""",
        "text_stats": f"""
            WITH toksed AS (
                SELECT doc_id, text, length(text) AS n_chars, {TOKENS_SQL} AS toks
                FROM documents),
            base AS (
                SELECT doc_id, text, n_chars, len(toks) AS n_tokens,
                       length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS n_alpha,
                       len(list_filter(toks, x -> x IN ('the','and','of','a','to','in')))
                           AS n_stop,
                       len(list_filter(toks, x -> x IN ('the','and','of'))) AS s_en,
                       len(list_filter(toks, x -> x IN ('der','und','die'))) AS s_de,
                       len(list_filter(toks, x -> x IN ('le','la','et'))) AS s_fr,
                       len(list_filter(toks, x -> x IN ('el','y','los'))) AS s_es
                FROM toksed)
            SELECT doc_id, n_chars, n_tokens,
                   round(CASE WHEN n_chars > 0 THEN CAST(n_alpha AS DOUBLE) / n_chars
                              ELSE 0.0 END, 6) AS alpha_ratio,
                   round(CASE WHEN n_tokens > 0 THEN CAST(n_stop AS DOUBLE) / n_tokens
                              ELSE 0.0 END, 6) AS stop_ratio,
                   CASE WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es AND s_en > 0
                            THEN 'en'
                        WHEN s_de >= s_fr AND s_de >= s_es AND s_de > 0 THEN 'de'
                        WHEN s_fr >= s_es AND s_fr > 0 THEN 'fr'
                        WHEN s_es > 0 THEN 'es'
                        ELSE 'und' END AS lang_pred,
                   round(0.5 * (CASE WHEN n_chars > 0
                                     THEN CAST(n_alpha AS DOUBLE) / n_chars
                                     ELSE 0.0 END)
                         + 0.5 * (1.0 - CASE WHEN n_tokens > 0
                                             THEN CAST(n_stop AS DOUBLE) / n_tokens
                                             ELSE 0.0 END), 6) AS quality_score
            FROM base""",
        "approx_distinct_users": kmv_oracle_sql(k=64),
        "events_quantiles_approx": approx_quantiles_oracle_sql(),
        "heavy_hitter_events": heavy_hitters_oracle_sql(width=8),
        "sample_documents": sample_oracle_sql(),
        "split_documents": split_oracle_sql(),
        "shuffle_documents": shuffle_oracle_sql(),
        "stratified_sample_documents": stratified_oracle_sql(),
        "decontaminate_split": decontaminate_oracle_sql(),
        "chunk_documents": text.chunk_documents_oracle_sql(),
        "ngram_decontaminate": ngram_decontaminate_oracle_sql(),
        "mix_rebalanced_documents": mix_rebalanced_oracle_sql(),
        "user_daily_activity": relational.user_daily_activity_oracle_sql(),
        "jsonl_roundtrip": """
            SELECT doc_id, text, lang, n_chars FROM documents
            ORDER BY doc_id""",
        "csv_roundtrip": """
            SELECT event_id, user_id, value FROM events
            ORDER BY event_id""",
        "partitioned_roundtrip": """
            SELECT doc_id, coalesce(lang, '') AS lang
            FROM documents WHERE coalesce(lang, '') IN ('en', 'fr')""",
        "tfidf_top_terms": text.tfidf_top_terms_oracle_sql(),
        "unigram_surprisal": text.unigram_surprisal_oracle_sql(),
        "vocab_top_tokens": text.vocab_top_tokens_oracle_sql(),
        "tokenize_docs": text.tokenize_docs_oracle_sql(),
        "source_mix_weights": text.source_mix_weights_oracle_sql(),
        "doc_length_buckets": text.doc_length_buckets_oracle_sql(),
        "conversation_docs": f"""{t}
            SELECT conv_id, count(*) AS n_turns,
                   length(string_agg(role || ': ' || coalesce(text, ''),
                                     chr(10) ORDER BY turn_idx)) AS n_chars,
                   string_agg(role || ': ' || coalesce(text, ''),
                              chr(10) ORDER BY turn_idx) AS doc
            FROM transcripts GROUP BY conv_id""",
        # concat-then-chunk packing: pack of a doc = global exclusive
        # prefix-sum of ws_tokens in doc_id order, floor-divided by budget
        "pack_sequences": f"""
            WITH tk AS (SELECT doc_id, len({{TOKENS}}) AS ws_tokens
                        FROM documents),
            c AS (SELECT doc_id, ws_tokens,
                         coalesce(sum(ws_tokens) OVER (ORDER BY doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND 1 PRECEDING), 0) AS cb
                  FROM tk)
            SELECT doc_id, ws_tokens,
                   CAST(cb // {text.PACK_BUDGET_TOKENS} AS BIGINT) AS pack_id
            FROM c""".replace("{TOKENS}", TOKENS_SQL),
        "minhash_lsh_pairs": _minhash_sql(threshold=0.5),
        "dedup_clusters": _clusters_sql(threshold=0.5),
        "dedup_keep_best": _keep_best_sql(threshold=0.5),
        "simhash_pairs": _simhash_sql(max_hamming=3),
        "ann_topk_lsh": _ann_lsh_sql(),
        "ann_topk_ivf": _ivf_sql(),
        "ann_topk_ivf_clustered": _ivf_sql(),
        "ann_topk_pq": _pq_sql(),
        "ann_topk_pq_indexed": _pq_sql(),
        "token_counts": f"""
            SELECT doc_id,
                   len({TOKENS_SQL}) AS ws_tokens,
                   len(regexp_extract_all(text, '[A-Za-z0-9_]+|[^A-Za-z0-9_\\s]'))
                       AS bpe_tokens
            FROM documents""",
        "quality_filter": f"""
            WITH t AS (SELECT doc_id, {TOKENS_SQL} AS toks FROM documents),
            s AS (SELECT doc_id, len(toks) AS n,
                         len(list_distinct(toks)) AS nd,
                         coalesce(list_sum(list_transform(toks, x -> length(x))), 0)
                             AS lensum,
                         len(list_filter(toks,
                             x -> x IN ('the','and','of','a','to','in'))) AS stop
                  FROM t)
            SELECT doc_id, n AS n_words,
                   round(CASE WHEN n > 0 THEN CAST(lensum AS DOUBLE) / n
                              ELSE 0.0 END, 6) AS mean_word_len,
                   round(CASE WHEN n > 0 THEN CAST(nd AS DOUBLE) / n
                              ELSE 0.0 END, 6) AS distinct_ratio,
                   stop > 0 AS has_stopword,
                   (n >= {text.QUALITY_MIN_WORDS} AND n <= {text.QUALITY_MAX_WORDS}
                    AND CAST(lensum AS DOUBLE) / n >= {text.QUALITY_MIN_MWL}
                    AND CAST(lensum AS DOUBLE) / n <= {text.QUALITY_MAX_MWL}
                    AND stop > 0
                    AND CAST(nd AS DOUBLE) / n >= {text.QUALITY_MIN_DISTINCT_RATIO})
                       AS keep
            FROM s""",
        "bag_dedup": f"""
            WITH c AS (SELECT doc_id,
                              array_to_string(list_sort({TOKENS_SQL}), ' ') AS canon
                       FROM documents)
            SELECT min(doc_id) AS doc_id, count(*) AS n_copies
            FROM c GROUP BY canon""",
        # typed-int extraction ONLY (the engine emits NULL for float/str/bool
        # k and for malformed JSON — a bare CAST(json_extract(..)) would
        # coerce "5"/1.5/true and ABORT on malformed payloads)
        "json_extract_events": """
            SELECT event_id,
                   CASE WHEN json_valid(props) THEN
                       CASE WHEN json_type(props, '$.k') IN ('BIGINT', 'UBIGINT')
                            THEN CAST(json_extract(props, '$.k') AS BIGINT) END
                   END AS k
            FROM events""",
        "fingerprints": "SELECT doc_id, md5(text) AS fingerprint FROM documents",
        # winnow64: min over char-8-gram md5-prefix hashes, signed-int64 view
        # of the uint64 min (HUGEINT bridges the UBIGINT->BIGINT reinterpret)
        "winnow_fingerprints": """
            WITH w AS (SELECT doc_id,
                              unnest(generate_series(1, greatest(length(coalesce(text, '')) - 7, 0))) AS i,
                              coalesce(text, '') AS t
                       FROM documents),
            h AS (SELECT doc_id,
                         ('0x' || substring(md5(substring(t, i, 8)), 1, 16))::UBIGINT AS hw
                  FROM w),
            m AS (SELECT doc_id, min(hw) AS mn FROM h GROUP BY doc_id)
            SELECT d.doc_id, md5(coalesce(d.text, '')) AS fingerprint,
                   CAST(coalesce(
                       CASE WHEN m.mn >= 9223372036854775808::UBIGINT
                            THEN m.mn::HUGEINT - 18446744073709551616::HUGEINT
                            ELSE m.mn::HUGEINT END, 0) AS BIGINT) AS winnow64
            FROM documents d LEFT JOIN m ON m.doc_id = d.doc_id""",
        "top_bigrams": f"""
            WITH t AS (SELECT {TOKENS_SQL} AS toks FROM documents),
            b AS (SELECT unnest(list_transform(
                      generate_series(1, len(toks) - 1),
                      i -> toks[i] || ' ' || toks[i + 1])) AS bigram
                  FROM t WHERE len(toks) >= 2)
            SELECT bigram, count(*) AS n
            FROM b GROUP BY bigram
            ORDER BY n DESC, bigram LIMIT 20""",
        "token_cooccurrence": f"""
            WITH t AS (SELECT doc_id, {TOKENS_SQL} AS toks FROM documents),
            p AS (SELECT doc_id, unnest(toks) AS term,
                         unnest(generate_series(1, len(toks))) AS pos
                  FROM t),
            pr AS (SELECT least(a.term, b.term) || ' ' ||
                          greatest(a.term, b.term) AS pair
                   FROM p a JOIN p b ON b.doc_id = a.doc_id
                       AND b.pos > a.pos AND b.pos <= a.pos + 3)
            SELECT pair, count(*) AS n FROM pr GROUP BY pair
            ORDER BY n DESC, pair LIMIT 30""",
        "bpe_pair_counts": f"""
            WITH t AS (SELECT {TOKENS_SQL} AS toks FROM documents),
            w AS (SELECT unnest(toks) AS word FROM t),
            wc AS (SELECT word, count(*) AS wn FROM w GROUP BY word),
            p AS (SELECT substring(word, i, 2) AS pair, wn
                  FROM wc,
                       UNNEST(generate_series(1, length(word) - 1)) AS s(i))
            SELECT pair, CAST(sum(wn) AS BIGINT) AS n FROM p GROUP BY pair
            ORDER BY n DESC, pair LIMIT 30""",
        "zipf_slope": f"""
            WITH tk AS (SELECT unnest({TOKENS_SQL}) AS token FROM documents),
            cnt AS (SELECT token, count(*) AS n FROM tk GROUP BY token),
            top AS (SELECT n, row_number() OVER (ORDER BY n DESC, token) AS r
                    FROM cnt ORDER BY n DESC, token LIMIT 200)
            SELECT count(*) AS k,
                   round(regr_slope(ln(n), ln(r)), 7) AS slope,
                   round(regr_intercept(ln(n), ln(r)), 7) AS intercept
            FROM top""",
        "rarest_terms": f"""
            WITH t AS (SELECT doc_id, {TOKENS_SQL} AS toks FROM documents),
            tok AS (SELECT DISTINCT doc_id, term
                    FROM (SELECT doc_id, unnest(toks) AS term FROM t)),
            df AS (SELECT term, count(*) AS doc_freq FROM tok GROUP BY term)
            SELECT tok.doc_id, tok.term AS rarest_term, df.doc_freq
            FROM tok JOIN df USING (term)
            QUALIFY row_number() OVER (PARTITION BY tok.doc_id
                                       ORDER BY df.doc_freq, tok.term) = 1""",
        # per-pattern counts summed: the engine's single alternation pass is
        # equal because the fixed n-grams cannot overlap each other
        "contamination_flags": """
            SELECT doc_id,
                   CAST({hits} AS BIGINT) AS n_hits,
                   ({hits}) > 0 AS contaminated
            FROM documents""".format(hits=" + ".join(
            f"len(regexp_extract_all(text, '{g}'))"
            for g in text.CONTAMINATION_NGRAMS)),
        "edit_dup_pairs": """
            WITH w AS (SELECT doc_id,
                              unnest(generate_series(1, greatest(length(coalesce(text, '')) - 7, 0))) AS i,
                              coalesce(text, '') AS t
                       FROM documents),
            h AS (SELECT doc_id,
                         ('0x' || substring(md5(substring(t, i, 8)), 1, 16))::UBIGINT AS hw
                  FROM w),
            m AS (SELECT doc_id, min(hw) AS mn FROM h GROUP BY doc_id),
            s AS (SELECT doc_id,
                         CAST(CASE WHEN mn >= 9223372036854775808::UBIGINT
                                   THEN mn::HUGEINT - 18446744073709551616::HUGEINT
                                   ELSE mn::HUGEINT END AS BIGINT) AS winnow64
                  FROM m),
            cand AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
                     FROM s a JOIN s b ON a.winnow64 = b.winnow64
                                      AND a.doc_id < b.doc_id
                     WHERE a.winnow64 <> 0)
            SELECT c.doc_a, c.doc_b,
                   CAST(levenshtein(coalesce(da.text, ''),
                                    coalesce(db.text, '')) AS BIGINT) AS dist
            FROM cand c
            JOIN documents da ON da.doc_id = c.doc_a
            JOIN documents db ON db.doc_id = c.doc_b
            WHERE levenshtein(coalesce(da.text, ''), coalesce(db.text, ''))
                  <= 0.2 * greatest(length(coalesce(da.text, '')),
                                    length(coalesce(db.text, '')))
            ORDER BY c.doc_a, c.doc_b""",
        "winnow_dup_pairs": """
            WITH w AS (SELECT doc_id,
                              unnest(generate_series(1, greatest(length(coalesce(text, '')) - 7, 0))) AS i,
                              coalesce(text, '') AS t
                       FROM documents),
            h AS (SELECT doc_id,
                         ('0x' || substring(md5(substring(t, i, 8)), 1, 16))::UBIGINT AS hw
                  FROM w),
            m AS (SELECT doc_id, min(hw) AS mn FROM h GROUP BY doc_id),
            s AS (SELECT doc_id,
                         CAST(CASE WHEN mn >= 9223372036854775808::UBIGINT
                                   THEN mn::HUGEINT - 18446744073709551616::HUGEINT
                                   ELSE mn::HUGEINT END AS BIGINT) AS winnow64
                  FROM m)
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.winnow64
            FROM s a JOIN s b ON a.winnow64 = b.winnow64
                             AND a.doc_id < b.doc_id
            WHERE a.winnow64 <> 0""",
        "multimodal_frames": """
            WITH b AS (SELECT doc_id, octet_length(encode(coalesce(text, ''))) AS nb
                       FROM documents),
            f AS (SELECT doc_id, nb,
                         unnest(generate_series(0, CAST(ceil(nb / 4096.0) AS INT) - 1, 2))
                             AS frame_idx
                  FROM b WHERE nb > 0)
            SELECT doc_id, frame_idx,
                   least(4096, nb - frame_idx * 4096) AS frame_len
            FROM f""",
        "multimodal_features": """
            SELECT doc_id, octet_length(encode(text)) AS n_bytes, md5(text) AS checksum,
                   octet_length(encode(text)) % 64 + 1 AS width,
                   octet_length(encode(text)) % 37 + 1 AS height
            FROM documents""",
        # synthetic_image sizes: w = id % 24 + 8, h = id % 16 + 8 — the
        # engine must recover these THROUGH a real encode→decode round trip
        "image_features": """
            SELECT doc_id, doc_id % 24 + 8 AS width, doc_id % 16 + 8 AS height
            FROM documents""",
        "image_resized_features": """
            SELECT doc_id, 16 AS width, 12 AS height FROM documents""",
        # full PCM-decode replay: DuckDB has no blob indexing, but
        # hex(blob) + substr recovers each little-endian int16 sample; the
        # per-window sum of integer squares is < 2^53 so the float64 sum is
        # EXACT on both sides (no order-of-addition drift before round-6)
        "audio_window_energy": """
            WITH pcm AS (
                SELECT doc_id, hex(encode(text)) AS h,
                       octet_length(encode(text)) // 2 AS n_samp
                FROM documents
            ), samp AS (
                SELECT doc_id, u.i // 256 AS window_idx,
                       ('0x' || substr(h, (4*u.i + 1)::BIGINT, 2))::INT
                       + 256 * ('0x' || substr(h, (4*u.i + 3)::BIGINT, 2))::INT
                           AS v
                FROM pcm, unnest(range(0, n_samp)) AS u(i)
            ), signed AS (
                SELECT doc_id, window_idx,
                       CASE WHEN v >= 32768 THEN v - 65536 ELSE v END AS s
                FROM samp
            )
            SELECT doc_id, window_idx, count(*)::BIGINT AS n_samples,
                   round(sqrt(sum(s*s)::DOUBLE / count(*)), 6) AS rms,
                   max(abs(s))::BIGINT AS peak
            FROM signed GROUP BY doc_id, window_idx""",
    }
