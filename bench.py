"""Benchmark harness.

Plain run: executes the headline pipelines over ``$GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) plus the streaming engine over a cached synthetic
bench stream, under ``ray.init(num_cpus=$RAY_GRAFT_CPUS or 32)``, and prints
ONE JSON line::

    {"metric": ..., "value": <headline sec>, "unit": "sec",
     "queries": {...}, "sf": ..., "num_cpus": N, "turns_per_s": ...}

``--scaling``: runs the plain bench twice in FRESH processes at num_cpus=8
and num_cpus=32 on the same input (the sandbox substitution for the
north rule's N vs 4N cluster sizes) and prints both throughputs plus the
scaling efficiency.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

BENCH_ROWS = int(os.environ.get("PWR_BENCH_ROWS", "80000000"))
BENCH_FILES = 256
EPOCH_FILES = 32
SEED = 42

CACHE = f"/tmp/pwr_bench_cache/v2_rows{BENCH_ROWS}_seed{SEED}_f{BENCH_FILES}"


N_CHUNKS = 32  # parallel generation tasks; BENCH_FILES = bands × chunks
N_BANDS = BENCH_FILES // N_CHUNKS


def _gen_chunk(chunk: int, rows_per_chunk: int, in_dir: str,
               band_bounds) -> list[str]:
    """Generate one deterministic conv-range chunk and write one file per
    global arrival band.  Files named part-{band:03d}-{chunk:03d}.parquet so
    the engine's sorted file list is band-major: epoch e = band e across all
    chunks (arrival order preserved at epoch granularity)."""
    import numpy as _np
    import pyarrow as _pa
    import pyarrow.parquet as _pq

    from pdf_watermark_remover_ray.sources.transcripts import generate_transcripts_fast

    table = generate_transcripts_fast(
        n_rows=rows_per_chunk, seed=SEED + 1000 + chunk, late_frac=0.02,
        conv_offset=chunk * (rows_per_chunk // 10 + 1) * 2,
    )
    arrival = table["arrival_us"].to_numpy()
    band = _np.clip(_np.searchsorted(band_bounds[1:-1], arrival, side="right"),
                    0, N_BANDS - 1)
    table = table.drop_columns(["arrival_us"])
    out = []
    for b in range(N_BANDS):
        sub = table.filter(_pa.array(band == b))
        path = os.path.join(in_dir, f"part-{b:03d}-{chunk:03d}.parquet")
        _pq.write_table(sub, path)
        out.append(path)
    return out


def ensure_bench_input() -> list[str]:
    """Generate (once) the bench transcript stream in parallel Ray tasks;
    cached across runs and across the two --scaling processes so both levels
    see identical input."""
    import glob

    import numpy as np

    import ray

    done = os.path.join(CACHE, "_DONE")
    if os.path.exists(done):
        return sorted(glob.glob(os.path.join(CACHE, "in", "part-*.parquet")))
    in_dir = os.path.join(CACHE, "in")
    os.makedirs(in_dir, exist_ok=True)
    base = 1_700_000_000_000_000
    # fixed global arrival-band boundaries (72 h conv-start spread + tail)
    band_bounds = np.linspace(base, base + 76 * 3_600_000_000, N_BANDS + 1)
    gen = ray.remote(num_cpus=1)(_gen_chunk)
    refs = [gen.remote(c, BENCH_ROWS // N_CHUNKS, in_dir, band_bounds)
            for c in range(N_CHUNKS)]
    paths = sorted(p for sub in ray.get(refs) for p in sub)
    with open(done, "w") as f:
        f.write("ok")
    return paths


def run_bench(num_cpus: int, sf_dir: str) -> dict:
    import shutil

    import ray

    # log_to_driver=False: keeps the bench JSON line clean of Ray's worker
    # log mirror (notably the cosmetic "Failed to hash the schemas ...
    # unhashable type: 'dict'" warning from ray.data's PandasBlockSchema
    # dedup); task/actor errors still propagate as exceptions.
    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             logging_level="ERROR", log_to_driver=False)
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    # Drop ONLY the empty-new-schema RefBundle warning: Ray's AllToAll sort
    # operator emits schema-less EMPTY blocks for empty reduce partitions
    # (minimal repro: range(100) -> groupby(k).map_groups(f) warns with
    # "new schema: PandasBlockSchema(names=[], ...)" before f is ever
    # called) — Ray-internal, not a batch-fn bug; our own batch fns return
    # typed empties (tests/test_round4_ops.py empty-input gates).  A GENUINE
    # mismatch (two non-empty differing schemas) still passes the filter.
    import logging as _logging

    class _EmptySchemaNoise(_logging.Filter):
        def filter(self, rec: _logging.LogRecord) -> bool:
            m = rec.getMessage()
            return not ("different schema" in m and
                        ("new schema: ." in m or
                         "new schema: PandasBlockSchema(names=[]" in m))

    # filters don't propagate to child loggers: attach to the emitting
    # module logger and to every installed ray/root handler
    _logging.getLogger(
        "ray.data._internal.execution.streaming_executor_state"
    ).addFilter(_EmptySchemaNoise())
    for _name in ("ray", "ray.data", ""):
        for _h in _logging.getLogger(_name).handlers:
            _h.addFilter(_EmptySchemaNoise())

    from pdf_watermark_remover_ray.config import StreamConfig
    from pdf_watermark_remover_ray.pipelines import dedup, relational, similarity, text
    from pdf_watermark_remover_ray.pipelines.streaming import StreamingEngine
    from pdf_watermark_remover_ray.stages.join import stream_join
    from pdf_watermark_remover_ray.stages.windows import session_windows, tumbling_counts
    from pdf_watermark_remover_ray.sources.transcripts import derive_transcripts

    paths = ensure_bench_input()
    # warm the page cache so both levels measure compute+shuffle, not cold disk
    for p in paths:
        with open(p, "rb") as f:
            f.read()
    # Warm the Ray worker pool AND the package import in every worker (worker
    # start + first import are ~1s each; at 32 cpus a cold pool otherwise
    # dominates the first epoch).
    import ray.data as _rd

    from pdf_watermark_remover_ray.config import ScrubConfig
    from pdf_watermark_remover_ray.functions.scrub import make_scrub_batch_fn

    _scrub = make_scrub_batch_fn(ScrubConfig())

    def _warm(b):
        import pyarrow as _pa

        _scrub(_pa.table({"text": _pa.array(["warm up"], _pa.string())}))
        return b

    _rd.range(num_cpus * 8, override_num_blocks=num_cpus * 4) \
        .map_batches(_warm).materialize()

    timings: dict[str, float] = {}

    def timed(name, fn):
        t0 = time.monotonic()
        out = fn()
        timings[name] = round(time.monotonic() - t0, 3)
        return out

    # headline: full streaming pipeline (scrub + sessions + windows + join +
    # watermark + exactly-once sink) over the bench stream.  Repeated
    # (best-of-N, default 2) because the shared VM's capacity fluctuates —
    # a single sample regularly lands in a noisy-neighbour window.
    out_dir = f"{CACHE}/out_cpus{num_cpus}"
    cfg = StreamConfig(num_partitions=32, epoch_rows=BENCH_ROWS // 8)
    n_rows = BENCH_ROWS

    def run_stream():
        shutil.rmtree(out_dir, ignore_errors=True)
        eng = StreamingEngine(paths, out_dir, cfg, epoch_files=EPOCH_FILES,
                              actor_cpus=0.1)
        return eng.run()

    headline_runs = []
    for _ in range(int(os.environ.get("PWR_BENCH_HEADLINE_REPEAT", "2"))):
        t0 = time.monotonic()
        run_stream()
        headline_runs.append(round(time.monotonic() - t0, 3))
    timings["streaming_pipeline"] = min(headline_runs)

    if int(os.environ.get("PWR_BENCH_HEADLINE_ONLY", "0")):
        # scaling mode: the subprocess only contributes its headline time —
        # skip the per-op tail so a scarce healthy-host window fits all runs
        ray.shutdown()
        return _summary(timings, headline_runs, n_rows, sf_dir, num_cpus)

    # batch-mode operators over the driver testdata at sf0.1
    timed("q1_pricing_summary", lambda: relational.q1_pricing_summary(sf_dir))
    timed("q3_top_orders", lambda: relational.q3_top_orders(sf_dir))
    timed("session_windows", lambda: session_windows(
        derive_transcripts(sf_dir, num_partitions=32), 1_800_000_000,
        num_partitions=32).materialize())
    timed("stream_join", lambda: stream_join(
        derive_transcripts(sf_dir, num_partitions=32), 1_800_000_000,
        num_partitions=32).materialize())
    timed("tumbling_counts", lambda: tumbling_counts(
        derive_transcripts(sf_dir, num_partitions=32), 3_600_000_000).materialize())
    timed("exact_dedup", lambda: dedup.exact_dedup(sf_dir).materialize())
    timed("minhash_lsh_pairs", lambda: dedup.minhash_lsh_pairs(sf_dir))
    timed("dedup_clusters", lambda: dedup.dedup_clusters(sf_dir))
    timed("events_quantiles",
          lambda: relational.events_quantiles(sf_dir).materialize())
    timed("ann_topk", lambda: similarity.ann_topk(sf_dir))
    timed("text_stats", lambda: text.text_stats(sf_dir).materialize())
    from pdf_watermark_remover_ray.pipelines.queries import (
        q_cep_funnel,
        q_events_orders_asof,
        q_range_join,
    )

    timed("cep_funnel", lambda: q_cep_funnel(sf_dir).materialize())
    timed("range_join", lambda: q_range_join(sf_dir).materialize())
    timed("events_orders_asof",
          lambda: q_events_orders_asof(sf_dir).materialize())
    timed("quality_filter", lambda: text.quality_filter(sf_dir).materialize())
    timed("winnow_dup_pairs",
          lambda: dedup.winnow_dup_pairs(sf_dir).materialize())
    timed("cohort_retention",
          lambda: relational.cohort_retention(sf_dir).materialize())
    timed("doc_length_buckets",
          lambda: text.doc_length_buckets(sf_dir).materialize())
    # round-3 additions
    timed("q7_volume_shipping", lambda: relational.q7_volume_shipping(sf_dir))
    timed("tfidf_top_terms",
          lambda: text.tfidf_top_terms(sf_dir).materialize())
    timed("label_centroids", lambda: similarity.label_centroids(sf_dir))
    from pdf_watermark_remover_ray.pipelines.queries import q_cep_timeouts

    timed("cep_timeouts", lambda: q_cep_timeouts(sf_dir).materialize())
    # round-4 additions
    from pdf_watermark_remover_ray.functions.sketches import cms_user_counts
    from pdf_watermark_remover_ray.pipelines.queries import (
        q_dedup_turns,
        q_pii_redact_turns,
    )

    timed("dedup_turns", lambda: q_dedup_turns(sf_dir).materialize())
    timed("pii_redacted_turns",
          lambda: q_pii_redact_turns(sf_dir).materialize())
    timed("repetition_scores",
          lambda: text.repetition_scores(sf_dir).materialize())
    timed("cms_user_counts",
          lambda: cms_user_counts(sf_dir).materialize())
    timed("bloom_semijoin_revenue",
          lambda: relational.bloom_semijoin_revenue(sf_dir).materialize())
    timed("q18_large_orders", lambda: relational.q18_large_orders(sf_dir))
    from pdf_watermark_remover_ray.pipelines.curate import curate_corpus

    timed("dup_spans", lambda: dedup.dup_spans(sf_dir).materialize())
    timed("curate_corpus", lambda: curate_corpus(sf_dir).materialize())
    timed("q6_forecast_revenue",
          lambda: relational.q6_forecast_revenue(sf_dir))
    timed("q10_returned_items",
          lambda: relational.q10_returned_items(sf_dir))
    timed("user_daily_locf",
          lambda: relational.user_daily_locf(sf_dir).materialize())
    # round-4 session-2 additions
    from pdf_watermark_remover_ray.functions.sampling import ngram_decontaminate
    from pdf_watermark_remover_ray.pipelines.multimodal import image_features

    timed("ngram_decontaminate",
          lambda: ngram_decontaminate(sf_dir).materialize())
    timed("chunk_documents",
          lambda: text.chunk_documents(sf_dir).materialize())
    # index cache keyed by sf_dir too: a stale index built from another
    # scale factor references vec_ids the current table doesn't have
    sf_tag = os.path.basename(os.path.normpath(sf_dir))
    timed("ann_topk_pq_indexed",
          lambda: similarity.ann_topk_pq_indexed(
              sf_dir, index_dir=f"{CACHE}/pq_index_{sf_tag}"))
    timed("image_features", lambda: image_features(sf_dir).materialize())
    # round-4 session-3 additions
    timed("q4_order_priority", lambda: relational.q4_order_priority(sf_dir))
    timed("q8_market_share", lambda: relational.q8_market_share(sf_dir))
    timed("q13_custdist", lambda: relational.q13_custdist(sf_dir))
    timed("q21_waiting_suppliers",
          lambda: relational.q21_waiting_suppliers(sf_dir))
    timed("bm25_topk", lambda: text.bm25_topk(sf_dir))
    timed("semantic_dedup", lambda: dedup.semantic_dedup(sf_dir))
    # round-4 session-4 additions
    # the Dataset-BSP PageRank is the SEMANTICS reference (oracle-gated,
    # equality-tested vs pinned); the pinned Pregel variant is the
    # recommended execution path and the one benched (the Dataset variant
    # pays ~8 AllToAll fixed costs per superstep — 143 s vs 12 s at sf0.1
    # in the 2026-08-18 fallback run)
    timed("customer_supplier_pagerank_pinned",
          lambda: relational.customer_supplier_pagerank_pinned(sf_dir))
    timed("edit_dup_pairs", lambda: dedup.edit_dup_pairs(sf_dir))
    timed("token_cooccurrence", lambda: text.token_cooccurrence(sf_dir))
    timed("event_value_mad", lambda: relational.event_value_mad(sf_dir))
    timed("event_user_cube",
          lambda: relational.event_user_cube(sf_dir).materialize())
    timed("kmeans_embeddings",
          lambda: similarity.kmeans_embeddings(sf_dir))
    # round-5 session-8 additions
    timed("hybrid_topk_rrf", lambda: text.hybrid_topk_rrf(sf_dir))
    timed("dsir_weights", lambda: text.dsir_weights(sf_dir))
    timed("ngram_diversity", lambda: text.ngram_diversity(sf_dir))
    timed("lang_confusion", lambda: text.lang_confusion(sf_dir))

    ray.shutdown()
    return _summary(timings, headline_runs, n_rows, sf_dir, num_cpus)


def _summary(timings, headline_runs, n_rows, sf_dir, num_cpus) -> dict:
    # host-condition stamp: 32-way burn-probe parallel speedup (healthy host
    # ≈ 24-32×; noisy-neighbour windows drop well below — context for
    # comparing absolute times across rounds on this shared VM)
    try:
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from tools.host_health import probe

        health = probe(32)["parallel_speedup"]
    except Exception:
        health = None
    headline = timings["streaming_pipeline"]
    return {
        "host_parallel_speedup": health,
        "headline_runs": headline_runs,
        "metric": "streaming session-window + stateful-join pipeline wall time "
                  f"({n_rows} turns, {BENCH_FILES}-file stream, exactly-once sink)",
        "value": headline,
        "unit": "sec",
        "queries": timings,
        "sf": float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1),
        "num_cpus": num_cpus,
        "rows": n_rows,
        "turns_per_s": round(n_rows / headline, 1),
    }


def run_scaling() -> dict:
    """Same job, two parallelism levels, fresh processes (north-rule N vs 4N).

    Each level runs PWR_BENCH_REPEAT times (default 2) and keeps the fastest —
    this sandbox is a shared VM whose effective parallel capacity fluctuates
    (noisy neighbours), and a transient slow host hits the 32-core run far
    harder than the 8-core one."""
    repeat = int(os.environ.get("PWR_BENCH_REPEAT", "2"))
    results = {}
    all_secs: dict[int, list[float]] = {}
    import shutil as _sh

    for ncpu in (8, 32):
        # the process level already repeats; one headline run per process
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu),
                   PWR_BENCH_HEADLINE_REPEAT="1",
                   PWR_BENCH_HEADLINE_ONLY="1")
        cmd = [sys.executable, os.path.abspath(__file__)]
        if _sh.which("taskset"):
            # Confine the process to ncpu PHYSICAL cores: ray.init(num_cpus=8)
            # only limits Ray's logical slots — without affinity the "small
            # node" would still spread its actors over all 32 physical cores
            # and the comparison would not emulate an 8-core node.
            cmd = ["taskset", "-c", f"0-{ncpu - 1}"] + cmd
        best = None
        all_secs[ncpu] = []
        for _ in range(repeat):
            proc = subprocess.run(cmd, env=env, capture_output=True, text=True,
                                  cwd=os.path.dirname(os.path.abspath(__file__)))
            if proc.returncode != 0:
                sys.stderr.write(proc.stderr[-4000:])
                raise RuntimeError(f"bench subprocess (ncpu={ncpu}) failed")
            r = json.loads(proc.stdout.strip().splitlines()[-1])
            all_secs[ncpu].append(r["value"])
            if best is None or r["value"] < best["value"]:
                best = r
        results[ncpu] = best
    t8, t32 = results[8]["value"], results[32]["value"]
    eff = (t8 / t32) / (32 / 8)
    return {
        "sec_8": t8,
        "sec_32": t32,
        "turns_per_s_8": results[8]["turns_per_s"],
        "turns_per_s_32": results[32]["turns_per_s"],
        "speedup_8_to_32": round(t8 / t32, 3),
        "scaling_efficiency": round(eff, 3),
        "runs_8": all_secs[8],
        "runs_32": all_secs[32],
        "rows": results[32]["rows"],
        "queries_8": results[8]["queries"],
        "queries_32": results[32]["queries"],
    }


def run_streams_ab() -> dict:
    """Per-stream marginal-cost table (VERDICT r3 #2): leave-one-group-out
    headline runs vs the all-on baseline, so every default-on output
    stream's share of the headline is attributable.  Runs at a REDUCED row
    count (PWR_BENCH_ROWS, default 16M — its own input cache) because 9
    configs x best-of-N at 80M rows would not fit a healthy-host window;
    marginal PERCENTAGES are the durable result, not absolute seconds.
    Paired streams that project from one state kind (windows+wstats,
    wdistinct+wtopk, cep+cepk) A/B as one group — that is their real cost
    granularity.  cepp (off by default) is measured as an ADD-one row."""
    global BENCH_ROWS, CACHE
    BENCH_ROWS = int(os.environ.get("PWR_BENCH_ROWS", "16000000"))
    CACHE = f"/tmp/pwr_bench_cache/v2_rows{BENCH_ROWS}_seed{SEED}_f{BENCH_FILES}"
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    repeat = int(os.environ.get("PWR_BENCH_REPEAT", "2"))

    import shutil

    import ray

    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             logging_level="ERROR", log_to_driver=False)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from pdf_watermark_remover_ray.config import StreamConfig
    from pdf_watermark_remover_ray.pipelines.streaming import StreamingEngine
    from pdf_watermark_remover_ray.stages.cep import Term

    paths = ensure_bench_input()
    for p in paths:
        with open(p, "rb") as f:
            f.read()

    ALL = ("sessions", "windows", "wstats", "sliding", "wdistinct", "wtopk",
           "matches", "timeouts", "cep", "cepk", "dedup")
    GROUPS = {
        "sessions": ("sessions",),
        "windows+wstats": ("windows", "wstats"),
        "sliding": ("sliding",),
        "wdistinct+wtopk": ("wdistinct", "wtopk"),
        "matches": ("matches",),
        "timeouts": ("timeouts",),
        "cep+cepk": ("cep", "cepk"),
        "dedup": ("dedup",),
    }

    def probe():
        try:
            sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
            from tools.host_health import probe as p

            return p(32)["parallel_speedup"]
        except Exception:
            return None

    out_dir = f"{CACHE}/out_ab"

    def run_once(cfg: StreamConfig) -> float:
        shutil.rmtree(out_dir, ignore_errors=True)
        t0 = time.monotonic()
        StreamingEngine(paths, out_dir, cfg, epoch_files=EPOCH_FILES,
                        actor_cpus=0.1).run()
        return round(time.monotonic() - t0, 3)

    def best_of(cfg: StreamConfig) -> list[float]:
        return [run_once(cfg) for _ in range(repeat)]

    health_before = probe()
    base_kw = dict(num_partitions=32, epoch_rows=BENCH_ROWS // 8)
    # PAIRED A/B: every variant run is immediately preceded by its own
    # all-on reference run, and the marginal is computed within the pair —
    # the shared VM's capacity drifts on the minutes scale, so a single
    # up-front baseline poisons the later rows (observed: -68% "marginals"
    # when the host degraded mid-sweep); adjacent pairing cancels drift to
    # the ~45 s pair span.
    variants = {}
    for name, members in GROUPS.items():
        off = tuple(s for s in ALL if s not in members)
        variants[name] = ("off", StreamConfig(**base_kw, emit_streams=off))
    variants["cepp"] = ("add", StreamConfig(**base_kw, cep_terms=(
        Term(role="user", text_regex=r"\bstream\b"),
        Term(role="tool", tool="search"), Term(role="assistant"))))
    variants["wquant"] = ("add", StreamConfig(**base_kw, wquant_ps=(50, 95)))
    runs = {}
    table = {}
    refs = []
    for name, (kind, cfg_v) in variants.items():
        pair = []
        for _ in range(repeat):
            ref = run_once(StreamConfig(**base_kw))
            var = run_once(cfg_v)
            pair.append((ref, var))
        refs.extend(r for r, _ in pair)
        # the pair with the FASTEST reference ran in the cleanest window
        ref, var = min(pair)
        runs[name] = pair
        if kind == "off":
            table[name] = {"ref_s": ref, "off_s": var,
                           "marginal_s": round(ref - var, 3),
                           "marginal_pct": round(100 * (ref - var) / ref, 1)}
        else:
            table[name] = {"ref_s": ref, "on_s": var,
                           "marginal_s": round(var - ref, 3),
                           "marginal_pct": round(100 * (var - ref) / ref, 1)}
    health_after = probe()
    ray.shutdown()
    base = min(refs)
    return {"mode": "streams_ab", "rows": BENCH_ROWS, "num_cpus": num_cpus,
            "baseline_s": base, "runs": runs, "marginal": table,
            "host_parallel_speedup_before": health_before,
            "host_parallel_speedup_after": health_after}


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    elif "--streams-ab" in sys.argv:
        print(json.dumps(run_streams_ab()))
    else:
        num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
        sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
        print(json.dumps(run_bench(num_cpus, sf_dir)))
