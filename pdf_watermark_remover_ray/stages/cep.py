"""Complex-event-processing (CEP) sequence patterns over transcript streams.

MATCH_RECOGNIZE-style detection of role sequences within a conversation —
the batch/oracle-mode counterpart of the north rule's "CEP engine" claim
(the streaming incremental detector lives in :mod:`..pipelines.streaming`).
The reference's analog is its ordered multi-step pattern cascade per content
stream (T1→T5 fire in a fixed sequence per record,
``mechanisms/watermark_processor.py:64-158``); here the "pattern" ranges
over the ROLE sequence of consecutive turns instead of byte offsets.

Two pattern shapes, both fully vectorized per hash partition (numpy shifted
comparisons / run-length encoding — no per-conversation Python):

- :func:`sequence_matches` — a fixed contiguous role sequence
  (``A B C`` in MATCH_RECOGNIZE terms), every occurrence reported
  (overlaps allowed), with an event-time span bound ``ts[last] - ts[first]
  <= within_us``.
- :func:`kleene_matches` — ``user (tool)+ assistant``: a MAXIMAL run of
  consecutive tool turns bracketed by a user turn and an assistant turn
  (Kleene-plus), via vectorized run-length encoding.

Scale path: both ride the ONE conversation-hash partitioning
(:mod:`.partition`) every keyed stage reuses — the only shuffle is the
shared conv co-location; matching itself is O(n) numpy per partition.
Pattern length is fixed and small, so the shifted-comparison loop is over
the PATTERN (L terms), never over rows.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

import numpy as np
import pandas as pd

from .partition import partitioned_map
from .windows import ts_us_series


@dataclass(frozen=True)
class Term:
    """One pattern slot with optional per-term predicates beyond the role:
    ``tool`` is an exact match on the transcript's tool column, ``text_regex``
    a regex *search* over the text column (compiled once per partition call,
    evaluated vectorized over the whole partition — never per row in Python).
    ``None`` means "don't care" for that field, so ``Term(role="user")`` is
    exactly the plain role slot of :func:`sequence_matches`."""

    role: str | None = None
    tool: str | None = None
    text_regex: str | None = None


def term_mask(df: pd.DataFrame, term: Term) -> np.ndarray:
    """Vectorized boolean mask of the rows satisfying ``term`` — one pass of
    numpy/pandas-str kernels over the partition per term (L masks total,
    never a row loop)."""
    m = np.ones(len(df), dtype=bool)
    if term.role is not None:
        m &= df["role"].to_numpy() == term.role
    if term.tool is not None:
        m &= df["tool"].fillna("").to_numpy() == term.tool
    if term.text_regex is not None:
        pat = re.compile(term.text_regex)
        m &= df["text"].fillna("").str.contains(pat, regex=True).to_numpy()
    return m

_EMPTY_SEQ = {"conv_id": pd.Series([], dtype=str),
              "turn_idx": pd.Series([], dtype=np.int32),
              "dt_us": pd.Series([], dtype=np.int64)}

_EMPTY_KLEENE = {"conv_id": pd.Series([], dtype=str),
                 "turn_idx": pd.Series([], dtype=np.int32),
                 "n_tools": pd.Series([], dtype=np.int64),
                 "dt_us": pd.Series([], dtype=np.int64)}


def sequence_scan(conv: np.ndarray, role: np.ndarray, tix: np.ndarray,
                  ts: np.ndarray, pattern, within_us: int,
                  isnew: np.ndarray | None = None):
    """Vectorized contiguous-sequence scan over arrays sorted by (conv,
    turn_idx) — the ONE implementation behind the batch operator, the
    streaming engine's ``cep`` stream (which passes role CODES) and the
    single-process golden, exactly like :func:`kleene_scan`.

    Returns ``(idx, dt)``: start row indices of matches and their event-time
    SPAN ``max(ts) − min(ts)`` (span, not endpoint difference — sound under
    non-monotone ts; see :func:`sequence_matches`).  With ``isnew``, only
    matches containing ≥ 1 new row survive (the streaming exactly-once
    completion rule)."""
    masks = [role == term for term in pattern]
    return masked_sequence_scan(conv, tix, ts, masks, within_us, isnew=isnew)


def masked_sequence_scan(conv: np.ndarray, tix: np.ndarray, ts: np.ndarray,
                         masks, within_us: int,
                         isnew: np.ndarray | None = None):
    """The generalized contiguous-sequence kernel: pattern slot ``j`` is an
    arbitrary precomputed boolean mask (role equality, tool equality, text
    regex, any conjunction — see :class:`Term`).  :func:`sequence_scan` is
    the role-equality specialization.  Same contract: arrays sorted by
    (conv, turn_idx), returns ``(idx, dt)`` start indices + event-time spans.
    """
    L = len(masks)
    n = len(conv)
    if n < L:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    tix = tix.astype(np.int64)
    m = n - L + 1
    ok = np.ones(m, dtype=bool)
    anynew = np.zeros(m, dtype=bool) if isnew is not None else None
    for j, mask in enumerate(masks):  # loop over the PATTERN, not rows
        ok &= mask[j:m + j]
        if anynew is not None:
            anynew |= isnew[j:m + j]
    # rows are sorted (conv, turn_idx), so conv equality at the span ends
    # ⇒ one conversation; explicit turn_idx contiguity makes the matcher
    # correct on SPARSE inputs too (e.g. a late-filtered stream)
    ok &= conv[:m] == conv[L - 1:]
    ok &= tix[L - 1:] - tix[:m] == L - 1
    dt = np.maximum.reduce([ts[j:m + j] for j in range(L)]) \
        - np.minimum.reduce([ts[j:m + j] for j in range(L)])
    ok &= dt <= within_us
    if anynew is not None:
        ok &= anynew
    idx = np.flatnonzero(ok)
    return idx.astype(np.int64), dt[idx].astype(np.int64)


def sequence_matches(ds, pattern: tuple[str, ...], within_us: int,
                     num_partitions: int = 16,
                     hot_keys: tuple[str, ...] = ()):
    """All contiguous occurrences of ``pattern`` (role sequence) inside one
    conversation with event-time span ≤ ``within_us``.

    Returns ``(conv_id, turn_idx, dt_us)`` — ``turn_idx`` is the match's
    first turn, ``dt_us`` the event-time SPAN ``max(ts) - min(ts)`` over the
    match (span, not endpoint difference: identical when ts is monotone in
    turn_idx, but well-defined — and safe to evict against a watermark —
    when late-but-accepted rows break monotonicity; the streaming engine's
    ``cep`` stream shares this rule).  Matches may overlap (MATCH_RECOGNIZE
    ``AFTER MATCH SKIP TO NEXT ROW``): every starting position is reported,
    which is the order-free semantics a distributed engine can compute
    without cross-match sequential state.
    """
    L = len(pattern)
    if L < 1:
        raise ValueError("pattern must have at least one term")

    def match_partition(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["conv_id", "turn_idx"], kind="mergesort")
        if len(df) < L:
            return pd.DataFrame(_EMPTY_SEQ)
        conv = df["conv_id"].to_numpy()
        idx, dt = sequence_scan(conv, df["role"].to_numpy(),
                                df["turn_idx"].to_numpy(),
                                ts_us_series(df["ts"]), pattern, within_us)
        return pd.DataFrame({
            "conv_id": conv[idx],
            "turn_idx": df["turn_idx"].to_numpy()[idx].astype(np.int32),
            "dt_us": dt,
        })

    return partitioned_map(ds, match_partition, key="conv_id",
                           num_partitions=num_partitions, hot_keys=hot_keys)


def predicated_sequence_matches(ds, terms: tuple[Term, ...], within_us: int,
                                num_partitions: int = 16):
    """Contiguous sequence match where every pattern slot carries its own
    predicates (:class:`Term`: role + tool equality + text regex) — the
    MATCH_RECOGNIZE ``DEFINE`` clause generalization of
    :func:`sequence_matches` (which only tests the role column).

    Same semantics otherwise: every starting position within one conversation
    whose L consecutive turns satisfy their slot terms and whose event-time
    span ≤ ``within_us`` (overlaps allowed, ``SKIP TO NEXT ROW``).  Returns
    ``(conv_id, turn_idx, dt_us)``.

    Scale path: identical to :func:`sequence_matches` — rides the shared
    conv-hash shuffle; per partition the L term masks are each ONE vectorized
    pass (regexes compiled once per call, evaluated by the pandas str kernel),
    then the O(L) shifted-compare loop.
    """
    L = len(terms)
    if L < 1:
        raise ValueError("pattern must have at least one term")

    def match_partition(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["conv_id", "turn_idx"], kind="mergesort")
        if len(df) < L:
            return pd.DataFrame(_EMPTY_SEQ)
        conv = df["conv_id"].to_numpy()
        masks = [term_mask(df, t) for t in terms]
        idx, dt = masked_sequence_scan(conv, df["turn_idx"].to_numpy(),
                                       ts_us_series(df["ts"]), masks,
                                       within_us)
        return pd.DataFrame({
            "conv_id": conv[idx],
            "turn_idx": df["turn_idx"].to_numpy()[idx].astype(np.int32),
            "dt_us": dt,
        })

    return partitioned_map(ds, match_partition, key="conv_id",
                           num_partitions=num_partitions)


_EMPTY_FOLLOWED = {"conv_id": pd.Series([], dtype=str),
                   "turn_idx": pd.Series([], dtype=np.int32),
                   "dt_us": pd.Series([], dtype=np.int64)}


def followed_by_scan(df: pd.DataFrame, first: Term, then: Term,
                     within_us: int) -> pd.DataFrame:
    """Per-partition kernel for the NON-CONTIGUOUS ``A ... B`` pattern
    (positive counterpart of :func:`absence_scan`): every row matching
    ``first`` that has at least one same-conversation row matching ``then``
    at-or-after its event time within ``within_us`` — arbitrary turns may
    sit between them (MATCH_RECOGNIZE ``A {-.*?-} B``).

    Time-based like the absence pattern: the bound is on event time, not
    adjacency.  Vectorized as one forward ``merge_asof`` (earliest
    qualifying ``then`` ts per trigger) + a threshold compare.  Returns
    ``(conv_id, turn_idx, dt_us)`` with ``turn_idx`` the trigger turn and
    ``dt_us`` the event-time gap to the EARLIEST qualifying match — defined
    purely by ts, so ties among equal-ts matches cannot affect the output."""
    fm = term_mask(df, first)
    tm = term_mask(df, then)
    u = df[fm]
    if not len(u):
        return pd.DataFrame(_EMPTY_FOLLOWED)
    lu = pd.DataFrame({"conv_id": u["conv_id"].to_numpy(),
                       "ts_us": ts_us_series(u["ts"]),
                       "turn_idx": u["turn_idx"].to_numpy(np.int32)}) \
        .sort_values("ts_us", kind="mergesort")
    a = df[tm]
    if not len(a):
        return pd.DataFrame(_EMPTY_FOLLOWED)
    ra = pd.DataFrame({"conv_id": a["conv_id"].to_numpy(),
                       "a_ts_us": ts_us_series(a["ts"])}) \
        .sort_values("a_ts_us", kind="mergesort")
    m = pd.merge_asof(lu, ra, left_on="ts_us", right_on="a_ts_us",
                      by="conv_id", direction="forward")
    dt = m["a_ts_us"].to_numpy() - m["ts_us"].to_numpy()
    hit = m["a_ts_us"].notna().to_numpy() & (dt <= within_us)
    out = m[hit]
    return pd.DataFrame({
        "conv_id": out["conv_id"].to_numpy(),
        "turn_idx": out["turn_idx"].to_numpy(np.int32),
        "dt_us": dt[hit].astype(np.int64),
    })


def followed_by_matches(ds, first: Term, then: Term, within_us: int,
                        num_partitions: int = 16):
    """Distributed ``A ... B within T``: see :func:`followed_by_scan`.  Rides
    the ONE conv-hash shuffle shared by every keyed transcript stage."""

    def match_partition(df: pd.DataFrame) -> pd.DataFrame:
        return followed_by_scan(df, first, then, within_us)

    return partitioned_map(ds, match_partition, key="conv_id",
                           num_partitions=num_partitions)


_EMPTY_ABSENCE = {"conv_id": pd.Series([], dtype=str),
                  "turn_idx": pd.Series([], dtype=np.int32),
                  "deadline_us": pd.Series([], dtype=np.int64)}


def absence_matches(ds, within_us: int, num_partitions: int = 16,
                    trigger: str = "user", expected: str = "assistant"):
    """NEGATION pattern (CEP absence / timeout detection): every ``trigger``
    turn with NO ``expected`` turn in the same conversation at-or-after its
    event time within ``within_us`` — the MATCH_RECOGNIZE class a positive
    sequence matcher cannot express (``A NOT followed-by B within T``), and
    the alerting primitive of a conversation-SLA pipeline ("user asked,
    nothing answered for T").

    Time-based, not adjacency-based: any same-conv ``expected`` turn with
    ``ts ∈ [trigger.ts, trigger.ts + within]`` clears the trigger (turn
    contiguity is irrelevant to a timeout).  Vectorized per conv-hash
    partition as a FORWARD merge_asof (next expected-turn ts at-or-after
    each trigger ts) + one threshold compare — O(n log n) local sort, no
    per-row Python, same single conv shuffle every keyed stage reuses.
    Returns ``(conv_id, turn_idx, deadline_us)`` with ``deadline_us =
    trigger ts + within`` (the instant a streaming engine's watermark would
    fire the timeout)."""

    def match_partition(df: pd.DataFrame) -> pd.DataFrame:
        return absence_scan(df, within_us, trigger=trigger, expected=expected)

    return partitioned_map(ds, match_partition, key="conv_id",
                           num_partitions=num_partitions)


def absence_scan(df: pd.DataFrame, within_us: int, *, trigger: str = "user",
                 expected: str = "assistant") -> pd.DataFrame:
    """The pure per-partition kernel behind :func:`absence_matches` (exposed
    like :func:`sequence_scan` / :func:`kleene_scan` so the property tests
    can drive it directly): forward merge_asof to the next expected-turn ts
    per conversation, one threshold compare."""
    from .windows import ts_us_series

    u = df[df["role"] == trigger]
    if not len(u):
        return pd.DataFrame(_EMPTY_ABSENCE)
    lu = pd.DataFrame({"conv_id": u["conv_id"].to_numpy(),
                       "ts_us": ts_us_series(u["ts"]),
                       "turn_idx": u["turn_idx"].to_numpy(np.int32)}) \
        .sort_values("ts_us", kind="mergesort")
    a = df[df["role"] == expected]
    if len(a):
        ra = pd.DataFrame({"conv_id": a["conv_id"].to_numpy(),
                           "a_ts_us": ts_us_series(a["ts"])}) \
            .sort_values("a_ts_us", kind="mergesort")
        m = pd.merge_asof(lu, ra, left_on="ts_us", right_on="a_ts_us",
                          by="conv_id", direction="forward")
        timeout = m["a_ts_us"].isna().to_numpy() \
            | (m["a_ts_us"].to_numpy() - m["ts_us"].to_numpy()
               > within_us)
    else:
        m, timeout = lu, np.ones(len(lu), dtype=bool)
    out = m[timeout]
    return pd.DataFrame({
        "conv_id": out["conv_id"].to_numpy(),
        "turn_idx": out["turn_idx"].to_numpy(np.int32),
        "deadline_us": (out["ts_us"].to_numpy(np.int64) + within_us),
    })


def kleene_scan(conv: np.ndarray, role: np.ndarray, tix: np.ndarray,
                ts: np.ndarray, within_us: int,
                user, tool, assistant):
    """Vectorized ``user (tool)+ assistant`` scan over arrays sorted by
    (conv, turn_idx) — shared by the batch operator and the streaming
    engine's ``cepk`` stream (which passes role CODES instead of strings).

    Detects maximal runs of consecutive-``turn_idx`` tool turns bracketed by
    a contiguous user turn before and assistant turn after, with event-time
    SPAN ``max(ts) − min(ts)`` over user..assistant ≤ ``within_us`` (span,
    not endpoint difference — sound under non-monotone ts; see
    :func:`sequence_matches`).  Explicit turn_idx contiguity makes the scan
    correct on SPARSE buffers (turns still in flight / late-dropped).

    Returns ``(sp, s, e, en, dt)`` index arrays: bracket user row, run
    start/end, bracket assistant row, span per surviving match.
    """
    n = len(conv)
    empty = (np.zeros(0, np.int64),) * 4 + (np.zeros(0, np.int64),)
    if n < 3:
        return empty
    tix = tix.astype(np.int64)
    # run-length encode (conv, role) WITH turn_idx-contiguity breaks
    change = np.ones(n, dtype=bool)
    change[1:] = (conv[1:] != conv[:-1]) | (role[1:] != role[:-1]) \
        | (tix[1:] != tix[:-1] + 1)
    starts = np.flatnonzero(change)
    ends = np.append(starts[1:], n) - 1  # inclusive
    is_tool = role[starts] == tool
    s, e = starts[is_tool], ends[is_tool]
    ok = (s > 0) & (e + 1 < n)
    sp = np.maximum(s - 1, 0)
    en = np.minimum(e + 1, n - 1)
    ok &= (role[sp] == user) & (conv[sp] == conv[s]) & (tix[sp] == tix[s] - 1)
    ok &= (role[en] == assistant) & (conv[en] == conv[e]) \
        & (tix[en] == tix[e] + 1)
    idx = np.flatnonzero(ok)
    sp, s, e, en = sp[idx], s[idx], e[idx], en[idx]
    if len(sp) == 0:
        return empty
    # per-match ts span via interleaved reduceat segments [sp, en+1); the
    # ranges are pairwise disjoint and strictly increasing, so one padded
    # reduceat serves every match at once
    bounds = np.empty(2 * len(sp), dtype=np.int64)
    bounds[0::2] = sp
    bounds[1::2] = en + 1
    mx = np.maximum.reduceat(np.append(ts, np.int64(-(1 << 62))), bounds)[0::2]
    mn = np.minimum.reduceat(np.append(ts, np.int64(1 << 62)), bounds)[0::2]
    dt = mx - mn
    keep = dt <= within_us
    return (sp[keep].astype(np.int64), s[keep].astype(np.int64),
            e[keep].astype(np.int64), en[keep].astype(np.int64),
            dt[keep].astype(np.int64))


def kleene_matches(ds, within_us: int, num_partitions: int = 16):
    """``user (tool)+ assistant`` — a maximal consecutive tool run preceded
    by a user turn and followed by an assistant turn, event-time span ≤
    ``within_us``.

    Returns ``(conv_id, turn_idx, n_tools, dt_us)``: ``turn_idx`` is the
    opening user turn, ``n_tools`` the run length, ``dt_us = max(ts) −
    min(ts)`` over user..assistant.  Maximality makes matches disjoint per
    run, so the output is deterministic under any partitioning.
    """

    def match_partition(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["conv_id", "turn_idx"], kind="mergesort")
        conv = df["conv_id"].to_numpy()
        sp, s, e, en, dt = kleene_scan(
            conv, df["role"].to_numpy(), df["turn_idx"].to_numpy(),
            ts_us_series(df["ts"]), within_us,
            user="user", tool="tool", assistant="assistant")
        if len(sp) == 0:
            return pd.DataFrame(_EMPTY_KLEENE)
        return pd.DataFrame({
            "conv_id": conv[s],
            "turn_idx": df["turn_idx"].to_numpy()[sp].astype(np.int32),
            "n_tools": (e - s + 1).astype(np.int64),
            "dt_us": dt,
        })

    return partitioned_map(ds, match_partition, key="conv_id",
                           num_partitions=num_partitions)
