"""Pipeline configuration records.

The reference holds its run configuration in a flat bag of Tk variables
(``ui/app_ui.py:31-40``: input/output paths, ``name_var``, ``footer_var``,
``use_footer_var``, mode flags).  The engine equivalent is a frozen dataclass
passed into ``map_batches`` callables' constructors — never globals — mirroring
the reference's module seam where the processor is injected behind a 2-method
interface (``main/remove_watermark.py:53-55``).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field


@dataclass(frozen=True)
class ScrubConfig:
    """Parameters of the scrub kernel (reference T1-T5, SURVEY.md §2.2).

    ``name_pattern`` / ``footer_pattern`` are the user-supplied patterns
    (``ui/app_ui.py:163-179``); ``use_footer=False`` collapses the footer
    pattern to inactive exactly as the UI passes ``""`` when the checkbox is
    off (``ui/app_ui.py:280-282``).
    """

    name_pattern: str = "CONFIDENTIEL J.DUPONT"
    footer_pattern: str = "DOCUMENT NON APPLICABLE"
    use_footer: bool = True

    @property
    def effective_footer(self) -> str:
        return self.footer_pattern if self.use_footer else ""


# Role → small-int code for the CEP state buffer (strings never ship to or
# sit in the cepbuf state kind).
ROLE_CODES = {"user": 0, "assistant": 1, "tool": 2}

# Output streams a StreamConfig.emit_streams tuple may name ("turns"/"late"
# are core and always on; "cepp" is governed by cep_terms).
_OPTIONAL_STREAMS = frozenset((
    "sessions", "windows", "wstats", "sliding", "wdistinct", "wtopk",
    "matches", "timeouts", "cep", "cepk", "dedup", "wquant", "enrich"))


@dataclass(frozen=True)
class Tumbling:
    """Tumbling event-time window: fixed, non-overlapping ``size_us`` buckets."""

    size_us: int

    def assign(self, ts_us: int) -> int:
        return (ts_us // self.size_us) * self.size_us


@dataclass(frozen=True)
class Sliding:
    """Sliding window of ``size_us`` advancing every ``slide_us``.

    Pre-aggregation granularity is ``gcd(size, slide)``: gcd-bucket
    boundaries align with EVERY window boundary, so per-bucket counts roll up
    into overlapping windows exactly for any size/slide combination — with a
    non-divisible pair, slide-sized buckets would straddle window edges and
    over-count (the round-1 sliding rollup bug)."""

    size_us: int
    slide_us: int

    def n_windows(self) -> int:
        # Number of windows each event belongs to.
        return (self.size_us + self.slide_us - 1) // self.slide_us

    @property
    def bucket_us(self) -> int:
        return math.gcd(self.size_us, self.slide_us)

    def assign_bucket(self, ts_us):
        """gcd-bucket start for a ts (scalar or numpy array)."""
        return (ts_us // self.bucket_us) * self.bucket_us

    def n_windows_per_bucket(self) -> int:
        """Max windows any single gcd-bucket can feed: window ``ws`` covers
        bucket ``b`` iff ``ws <= b <= ws + size - bucket``."""
        return (self.size_us - self.bucket_us) // self.slide_us + 1


@dataclass(frozen=True)
class Session:
    """Session window: events of one key closer than ``gap_us`` merge."""

    gap_us: int


@dataclass(frozen=True)
class StreamConfig:
    """Configuration of the streaming epoch driver (SURVEY.md §7).

    ``lateness_us`` feeds the monotone watermark tracker (watermark after
    epoch e = max ts over epochs ≤ e − lateness); ``num_partitions`` is the
    explicit hash-partition count for keyed state (``hash(conv_id) % P``);
    ``epoch_rows`` sizes the deterministic epoch slicing of a bounded input.
    """

    num_partitions: int = 16
    lateness_us: int = 15_000_000
    session_gap_us: int = 30_000_000
    join_gap_us: int = 30_000_000
    tumbling_us: int = 60_000_000
    sliding_size_us: int = 60_000_000
    sliding_slide_us: int = 20_000_000
    epoch_rows: int = 50_000
    # Routing tasks stream input files in row-group batches of at most this
    # many rows, so task memory is bounded by the batch — not the file — size
    # (a 100 TB run has multi-GB files).  ~1M transcript rows ≈ 100-200 MB.
    route_batch_rows: int = 1_048_576
    # In-flight ingest batches a route task may hold before blocking on
    # acks: >0 overlaps read+scrub+stage of the next batch with the
    # previous ingest RTT (safe: the ingest concurrency group is width 1
    # and Ray preserves per-caller submission order, so a rollback retract
    # still lands after every in-flight ingest).  0 = barrier per batch.
    ack_window: int = 1
    # Full state snapshot every N epochs; in between, per-epoch DELTA
    # snapshots hold only the epoch's appended join-buffer rows (restore =
    # last full + deltas + watermark eviction thresholds), so checkpoint
    # I/O scales with the epoch's ingest, not total open state.
    snapshot_full_every: int = 8
    scrub: ScrubConfig = field(default_factory=ScrubConfig)
    # Fault injection (tests only): when set, each routing unit fails once
    # with a RuntimeError before succeeding on retry — proves the
    # at-least-once ingest + keyed-table dedup = exactly-once claim under
    # REAL Ray task retries.
    fault_inject_dir: str | None = None
    # Tests only: basename of one input file whose routing fails AFTER its
    # first batch was staged+ingested (every attempt) — exercises the
    # mid-file retract path that keeps per-file failures all-or-nothing.
    fault_midfile_file: str | None = None
    # Skew handling: hot conversations get RESERVED partitions (ids P..P+H-1,
    # one dedicated state actor each) instead of salting — salting a stateful
    # key would split its sessions/join state across actors (SURVEY.md §7.4
    # "Skew vs sessions").  Fixed for the run → deterministic replays.
    hot_keys: tuple[str, ...] = ()
    # Stream-table BROADCAST join (the structured-streaming "lookup join"):
    # tool-role turns are decorated at ROUTE time against this small static
    # dimension (tool -> group, weight) and emitted to the ``enrich`` output
    # stream.  The dim is a compile-time constant here; a runtime dim of any
    # size ships once per run via ``ray.put`` and is probed per batch — it
    # never shuffles, and the stream side never waits (map-side join).
    # Default OFF so the headline pipeline's cost stays attributable.
    enrich_stream: bool = False
    enrich_dim: tuple[tuple[str, str, float], ...] = (
        ("purchase", "g0", 0.1), ("error", "g1", 0.2), ("search", "g2", 0.3))
    # Streaming exact dedup: emit each distinct post-scrub text's first-seen
    # winner row to the ``dedup`` output stream.  Keyed by a 104-bit text
    # hash (two 52-bit halves — exact through the snapshot's int-as-float
    # round-trip; collision odds ~1e-8 at 10^12 rows), hash-partitioned
    # independently of conv_id so the seen-set shards uniformly.
    dedup_stream: bool = True
    # Bounded-state dedup horizon: with a TTL, a hash unseen for longer than
    # ``dedup_ttl_us`` of EVENT time is forgotten (its next occurrence
    # re-emits) and the seen-set stays O(distinct texts per horizon) instead
    # of O(all distinct texts ever).  None = exact/unbounded.  Must be >=
    # lateness_us: otherwise a late-but-accepted arrival could carry a ts
    # below an already-evicted hash's high mark, and a resumed run (which
    # reconstructs the high mark as a max over delta snapshots) would evict
    # on a different schedule than the uninterrupted run.
    dedup_ttl_us: int | None = None
    # Streaming CEP: contiguous role-sequence detection (``cep`` output
    # stream).  A match = turns (i .. i+L-1) of ONE conversation whose roles
    # equal ``cep_pattern`` in order, with turn_idx consecutive and the
    # event-time SPAN (max ts − min ts over the match — span, not endpoint
    # difference, so the watermark eviction bound holds even when late-but-
    # accepted rows make ts non-monotone in turn_idx) ≤ ``cep_within_us``.
    # A match is emitted in the epoch its last-arriving constituent lands.
    cep_pattern: tuple[str, ...] = ("user", "tool", "assistant")
    cep_within_us: int = 120_000_000
    # PREDICATED streaming CEP (``cepp`` output stream), optional: a tuple of
    # :class:`..stages.cep.Term` — per-slot predicates (role + tool equality
    # + text regex), the MATCH_RECOGNIZE DEFINE clause in streaming form.
    # Each row's per-term satisfaction bits are evaluated ONCE at route time
    # (where the text column still exists — text never reaches the state
    # actors) and packed into the high bits of the cepbuf "n" column, so the
    # state schema, delta snapshots and restore chain are untouched.  Same
    # span bound (cep_within_us), same completion-driven exactly-once rule.
    cep_terms: tuple | None = None
    # CEP NEGATION (timeouts stream): a "user" turn with no "assistant" turn
    # in the same conversation at EVENT time ∈ [trigger, trigger + within]
    # fires when the watermark passes the deadline.  Time-based, not
    # adjacency-based (a timeout does not care about turn contiguity).
    timeout_within_us: int = 30_000_000
    # windowed top-k: the k most frequent tools per (conv, tumbling window)
    # emitted on the ``wtopk`` stream (ties broken by tool name).
    wtopk_k: int = 3
    # Per-stream enablement: at 100 TB every default-on output stream has a
    # real fold/emit/IO cost, so a consumer should pay only for the streams
    # it reads.  None = all streams.  A tuple restricts the OPTIONAL streams
    # (sessions, windows, wstats, sliding, wdistinct, wtopk, matches,
    # timeouts, cep, cepk, dedup) — their folds, emissions AND state updates
    # are skipped entirely when off; "turns" and "late" are core route
    # outputs and always on; "cepp" is governed by cep_terms; "dedup"
    # additionally requires dedup_stream (hash work happens at route time).
    # Must be identical across a resume chain (epoch markers only carry
    # counts for enabled streams; state kinds of disabled streams stay
    # empty, so flipping a stream ON mid-chain would miss prior state).
    emit_streams: tuple[str, ...] | None = None
    # Open-state bound for pathological keys: the raw-row state kinds
    # (users/tools join buffers, cepbuf) are bounded by event-time horizon
    # x per-key RATE — one never-quiet, high-rate conversation can grow its
    # buffered rows without limit inside the horizon (at 100 TB that is an
    # actor OOM).  When set, each of those kinds keeps at most this many
    # NEWEST rows per conv_id at every epoch close (deterministic: frames
    # are key-sorted, the trim is a per-key tail), older rows are force-
    # dropped, and the dropped counts land in the committed epoch marker
    # (``capped_rows`` / ``capped``) — the dead-letter accounting pattern of
    # ST2.  Aggregate kinds (sessions/wstats/wtools/sliding) stay one row
    # per open key/window and need no cap.  None = unbounded (exact).
    max_open_rows_per_key: int | None = None
    # Windowed PERCENTILES (wquant stream): nearest-rank p-th percentiles of
    # the post-scrub text length per (conv, tumbling window).  Percentiles
    # are NOT decomposable from n/sum/min/max, so the state is per-(conv,
    # window, length-value) counts (the wtools trick: value-bounded, folds
    # by groupby-sum, one eviction).  Integer percents keep the rank target
    # exact integer arithmetic — ceil(n*p/100) — identical in engine and
    # oracle (a float q*N ceil can flip on representation error).  None =
    # stream off (the default; it never costs the headline), like cep_terms
    # governs cepp.
    wquant_ps: tuple[int, ...] | None = None

    def __post_init__(self) -> None:
        """Pre-flight validation (reference P2/P3 analog: the UI rejects bad
        input/patterns BEFORE any work starts, ``ui/app_ui.py:284-307``).  A
        bad config raises here — never at route time where the per-file
        failure isolation would silently dead-letter it."""
        checks = {
            "num_partitions must be >= 1": self.num_partitions >= 1,
            "ack_window must be >= 0": self.ack_window >= 0,
            "lateness_us must be >= 0": self.lateness_us >= 0,
            "session_gap_us must be > 0": self.session_gap_us > 0,
            "join_gap_us must be > 0": self.join_gap_us > 0,
            "tumbling_us must be > 0": self.tumbling_us > 0,
            "sliding_size_us must be > 0": self.sliding_size_us > 0,
            "sliding_slide_us must be > 0": self.sliding_slide_us > 0,
            "epoch_rows must be > 0": self.epoch_rows > 0,
            "route_batch_rows must be > 0": self.route_batch_rows > 0,
            "snapshot_full_every must be >= 1": self.snapshot_full_every >= 1,
            "dedup_ttl_us must be >= lateness_us (determinism under resume)":
                self.dedup_ttl_us is None or self.dedup_ttl_us >= self.lateness_us,
            "cep_pattern must be a non-empty tuple of known roles":
                len(self.cep_pattern) >= 1
                and all(r in ("user", "assistant", "tool")
                        for r in self.cep_pattern),
            "cep_within_us must be > 0": self.cep_within_us > 0,
            "cep_terms must be a non-empty tuple of Terms with known roles":
                self.cep_terms is None
                or (len(self.cep_terms) >= 1 and len(self.cep_terms) <= 8
                    and all(getattr(t, "role", 0) is None
                            or getattr(t, "role", 0)
                            in ("user", "assistant", "tool")
                            for t in self.cep_terms)),
            "timeout_within_us must be > 0": self.timeout_within_us > 0,
            "wtopk_k must be >= 1": self.wtopk_k >= 1,
            "max_open_rows_per_key must be >= 1 when set":
                self.max_open_rows_per_key is None
                or self.max_open_rows_per_key >= 1,
            "wquant_ps must be 1-4 integer percents in [1, 100]":
                self.wquant_ps is None
                or (1 <= len(self.wquant_ps) <= 4
                    and all(isinstance(q, int) and 1 <= q <= 100
                            for q in self.wquant_ps)),
            "emit_streams must name known optional streams":
                self.emit_streams is None
                or all(s in _OPTIONAL_STREAMS for s in self.emit_streams),
        }
        bad = [msg for msg, ok in checks.items() if not ok]
        if bad:
            raise ValueError("invalid StreamConfig: " + "; ".join(bad))

    def stream_on(self, name: str) -> bool:
        """Is the optional output stream enabled under ``emit_streams``?
        (Does not fold in dedup_stream / cep_terms — callers combine.)"""
        return self.emit_streams is None or name in self.emit_streams

    @property
    def cep_codes(self) -> tuple[int, ...]:
        """Pattern as small-int role codes (what the state store buffers)."""
        return tuple(ROLE_CODES[r] for r in self.cep_pattern)

    @property
    def tumbling_spec(self) -> Tumbling:
        return Tumbling(self.tumbling_us)

    @property
    def sliding_spec(self) -> Sliding:
        return Sliding(self.sliding_size_us, self.sliding_slide_us)

    @property
    def session_spec(self) -> Session:
        return Session(self.session_gap_us)

    @property
    def total_partitions(self) -> int:
        return self.num_partitions + len(self.hot_keys)
