"""Transcript table sources.

The engine's canonical input is the transcript table
``(conv_id:string, turn_idx:int32, role:string, text:string, tool:string,
ts:timestamp[us])`` (BASELINE.json → input_hint).  Two sources:

1. :func:`derive_transcripts` — a deterministic, SQL-expressible projection of
   the driver-provided ``events`` table into transcript shape, so every
   windowing / join / watermark query has a DuckDB oracle over the same
   pre-registered views (``TRANSCRIPTS_CTE`` is the oracle-side equivalent).
2. :func:`generate_transcripts` — the seeded synthetic generator of
   FIXTURES.md (F1 scrub-pattern corpus, F2 late data, F3 hot keys, F4 join
   pairings) for golden tests and the bench stream.

The reference's "source" is a folder listing filtered on a suffix predicate
(``mechanisms/watermark_processor.py:235``); here the source is Parquet with
column pruning at the read, and the page-order invariant becomes the stable
``(conv_id, turn_idx)`` ordering (SURVEY.md §1.3).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

# Deterministic event→transcript mapping, one definition for engine and
# oracle.  role: click/view → user, signup → assistant, purchase/error → tool.
TRANSCRIPTS_CTE = """
transcripts AS (
    SELECT
        'c' || lpad(CAST(user_id AS VARCHAR), 6, '0') AS conv_id,
        CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1
             AS INTEGER) AS turn_idx,
        CASE WHEN event_type IN ('click', 'view') THEN 'user'
             WHEN event_type = 'signup' THEN 'assistant'
             ELSE 'tool' END AS role,
        props AS text,
        CASE WHEN event_type IN ('purchase', 'error') THEN event_type
             ELSE '' END AS tool,
        ts,
        event_id
    FROM events
)
"""

TRANSCRIPT_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("text", pa.string()),
        ("tool", pa.string()),
        ("ts", pa.timestamp("us")),
    ]
)

_ROLE_USER_TYPES = ("click", "view")
_ROLE_ASSISTANT_TYPES = ("signup",)


def _events_to_transcripts_pdf(df: pd.DataFrame) -> pd.DataFrame:
    """Vectorized events→transcripts for one hash partition (all rows of any
    user_id are guaranteed co-located by the caller)."""
    df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
    conv_id = "c" + df["user_id"].astype(str).str.zfill(6)
    turn_idx = df.groupby("user_id", sort=False).cumcount().astype("int32")
    et = df["event_type"]
    role = np.where(
        et.isin(_ROLE_USER_TYPES), "user",
        np.where(et.isin(_ROLE_ASSISTANT_TYPES), "assistant", "tool"),
    )
    tool = np.where(role == "tool", et, "")
    return pd.DataFrame(
        {
            "conv_id": conv_id.to_numpy(),
            "turn_idx": turn_idx.to_numpy(),
            "role": role,
            "text": df["props"].to_numpy(),
            "tool": tool,
            "ts": df["ts"].to_numpy(),
            "event_id": df["event_id"].to_numpy(),
        }
    )


def derive_transcripts(
    sf_dir: str,
    num_partitions: int = 16,
    keep_event_id: bool = False,
) -> "ray.data.Dataset":
    """events.parquet → transcript Dataset.

    Scale path: the per-conversation dense rank needs all turns of a
    conversation co-located once — ONE hash shuffle on the conversation key
    (``user_id % P``), then a fully vectorized pandas rank per partition.
    ``groupby("part")`` with P partition-groups (not one group per
    conversation) keeps per-group Python overhead at O(P), not O(keys);
    downstream window/join stages reuse the same key partitioning.
    """
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type", "props"],
    )
    ds = ds.map_batches(
        lambda t: t.append_column(
            "part", pa.array((t["user_id"].to_numpy() % num_partitions).astype(np.int32))
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    out = ds.groupby("part").map_groups(
        lambda g: _events_to_transcripts_pdf(g), batch_format="pandas"
    )
    cols = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    if keep_event_id:
        cols.append("event_id")
    return out.select_columns(cols)


# ---------------------------------------------------------------------------
# Synthetic generator (FIXTURES.md).  Deterministic: numpy Generator(seed).
# ---------------------------------------------------------------------------

_PLAIN_WORDS = (
    "the quick brown fox jumps over the lazy dog near the river bank "
    "data stream window join state actor shuffle partition arrow batch"
).split()

_TOOLS = ("search", "exec", "browse", "fetch", "calc")


def _make_text(rng: np.random.Generator, kind: int, name_pat: str, footer_pat: str) -> str:
    words = " ".join(rng.choice(_PLAIN_WORDS, size=rng.integers(4, 14)))
    if kind == 0:  # plain
        return words
    if kind == 1:  # T1 name pattern, 1-3 occurrences incl. adjacent repeats
        n = int(rng.integers(1, 4))
        body = (" " + name_pat) * n if rng.random() < 0.3 else (" " + name_pat + " x") * n
        return words + body
    if kind == 2:  # T2 footer
        return words + " " + footer_pat + " tail"
    if kind == 3:  # T3 anchored span with varying end markers
        marker = ("Tj", "ET", "TD", ")")[int(rng.integers(0, 4))]
        return words + " (Document non tenu à jour au 2026-07-08) " + marker + " rest"
    if kind == 4:  # T4 hex-anchor inside parens (and a no-paren variant)
        anchor = ("44 6f 63 75 6d", "6e 6f 6e 20 74 65 6e 75")[int(rng.integers(0, 2))]
        if rng.random() < 0.3:
            return words + " " + anchor + " no paren here"
        return words + " (" + anchor + " payload) " + words
    # kind == 5: T5 color-marker block
    m = ("1 0 0 rg", "0.8 0 0 rg", "1 0 0 RG")[int(rng.integers(0, 3))]
    return words + " BT " + m + " (WATERMARK) Tj ET " + words


def generate_transcripts(
    n_convs: int = 200,
    mean_turns: int = 10,
    seed: int = 42,
    name_pattern: str = "CONFIDENTIEL J.DUPONT",
    footer_pattern: str = "DOCUMENT NON APPLICABLE",
    late_frac: float = 0.0,
    hot_keys: int = 0,
    hot_frac: float = 0.3,
    base_ts_us: int = 1_700_000_000_000_000,
    session_gap_us: int = 30_000_000,
) -> pa.Table:
    """Seeded transcript fixture (F1; F2 via ``late_frac``; F3 via hot keys).

    Turn timestamps advance by a mix of small steps and occasional
    session-gap-sized jumps so session windows have real structure; with
    ``late_frac`` a known subset of turns is shifted backwards by 1-3 window
    widths (``turn_idx`` stays in order) to exercise watermark late-drops.
    """
    rng = np.random.default_rng(seed)
    sizes = np.maximum(1, rng.poisson(mean_turns, size=n_convs))
    if hot_keys:
        total = sizes.sum()
        hot_total = int(total * hot_frac / (1 - hot_frac))
        sizes[:hot_keys] = np.maximum(sizes[:hot_keys], hot_total // hot_keys)
    rows_conv, rows_turn, rows_role, rows_text, rows_tool, rows_ts = [], [], [], [], [], []
    rows_arrival = []
    for c in range(n_convs):
        conv = f"c{c:06d}"
        n = int(sizes[c])
        start = base_ts_us + int(rng.integers(0, 3_600_000_000))
        steps = rng.integers(1_000_000, 20_000_000, size=n)
        gap_mask = rng.random(n) < 0.08
        steps = np.where(gap_mask, steps + session_gap_us * 2, steps)
        arrival = start + np.cumsum(steps)  # in-order arrival position
        ts = arrival
        if late_frac > 0:
            late = rng.random(n) < late_frac
            shift = rng.integers(1, 4, size=n) * 60_000_000
            ts = np.where(late, ts - shift, ts)
        roles = rng.choice(["user", "assistant", "tool"], size=n, p=[0.45, 0.35, 0.2])
        kinds = rng.choice(
            [0, 1, 2, 3, 4, 5], size=n, p=[0.60, 0.10, 0.10, 0.08, 0.06, 0.06]
        )
        for i in range(n):
            rows_conv.append(conv)
            rows_turn.append(i)
            rows_role.append(roles[i])
            rows_text.append(_make_text(rng, int(kinds[i]), name_pattern, footer_pattern))
            rows_tool.append(
                _TOOLS[int(rng.integers(0, len(_TOOLS)))] if roles[i] == "tool" else ""
            )
            rows_ts.append(int(ts[i]))
            rows_arrival.append(int(arrival[i]))
    # P4 edge rows: empty / null text.
    for j, payload in enumerate(["", None, ""]):
        rows_conv.append(f"c{n_convs + j:06d}")
        rows_turn.append(0)
        rows_role.append("user")
        rows_text.append(payload)
        rows_tool.append("")
        rows_ts.append(base_ts_us + j)
        rows_arrival.append(base_ts_us + j)
    return pa.table(
        {
            "conv_id": pa.array(rows_conv, pa.string()),
            "turn_idx": pa.array(rows_turn, pa.int32()),
            "role": pa.array(rows_role, pa.string()),
            "text": pa.array(rows_text, pa.string()),
            "tool": pa.array(rows_tool, pa.string()),
            "ts": pa.array(rows_ts, pa.timestamp("us")),
            # arrival_us: in-order arrival position (pre-lateness ts) — used
            # only to lay the stream out into files; NOT part of the schema.
            "arrival_us": pa.array(rows_arrival, pa.int64()),
        }
    )


def generate_transcripts_fast(
    n_rows: int = 2_000_000,
    mean_turns: int = 10,
    seed: int = 42,
    name_pattern: str = "CONFIDENTIEL J.DUPONT",
    footer_pattern: str = "DOCUMENT NON APPLICABLE",
    late_frac: float = 0.02,
    text_pool: int = 20_000,
    base_ts_us: int = 1_700_000_000_000_000,
    session_gap_us: int = 30_000_000,
    conv_offset: int = 0,
) -> pa.Table:
    """Fully vectorized bench-scale fixture (FIXTURES.md F1 'bench').

    Same statistical shape as :func:`generate_transcripts` but texts are drawn
    from a pre-generated pool (the scrub kernel's work depends on pattern mix,
    not uniqueness), so 10^6+ rows generate in seconds with zero per-row
    Python.
    """
    rng = np.random.default_rng(seed)
    # text pool with the F1 pattern mix
    pool_rng = np.random.default_rng(seed + 1)
    pool_kinds = pool_rng.choice([0, 1, 2, 3, 4, 5], size=text_pool,
                                 p=[0.60, 0.10, 0.10, 0.08, 0.06, 0.06])
    pool = np.array(
        [_make_text(pool_rng, int(k), name_pattern, footer_pattern) for k in pool_kinds],
        dtype=object,
    )
    n_convs = max(1, n_rows // mean_turns)
    sizes = np.maximum(1, rng.poisson(mean_turns, size=n_convs))
    total = int(sizes.sum())
    # build one id string per conversation, then repeat — the string ufuncs
    # run on n_convs elements, not n_rows
    per_conv_ids = np.char.add(
        "c", np.char.zfill(np.arange(conv_offset, conv_offset + n_convs).astype(str), 8)
    )
    conv_ids = np.repeat(per_conv_ids, sizes)
    # turn_idx = position within conversation (vectorized cumcount)
    starts = np.concatenate([[0], np.cumsum(sizes)[:-1]])
    turn_idx = (np.arange(total) - np.repeat(starts, sizes)).astype(np.int32)
    # event times: per-conv start + cumulative steps (reset per conv)
    conv_start = base_ts_us + rng.integers(0, 72 * 3_600_000_000, size=n_convs)
    steps = rng.integers(1_000_000, 20_000_000, size=total)
    gap_mask = rng.random(total) < 0.08
    steps = np.where(gap_mask, steps + session_gap_us * 2, steps)
    cum = np.cumsum(steps)
    cum_at_start = np.concatenate([[0], cum[np.cumsum(sizes) - 1][:-1]])
    arrival = np.repeat(conv_start, sizes) + (cum - np.repeat(cum_at_start, sizes))
    ts = arrival.copy()
    if late_frac > 0:
        late = rng.random(total) < late_frac
        ts = np.where(late, ts - rng.integers(1, 4, size=total) * 60_000_000, ts)
    roles = rng.choice(["user", "assistant", "tool"], size=total, p=[0.45, 0.35, 0.2])
    texts = pool[rng.integers(0, text_pool, size=total)]
    tools = np.where(roles == "tool",
                     np.array(_TOOLS, dtype=object)[rng.integers(0, len(_TOOLS), size=total)],
                     "")
    # Pre-sort by arrival while everything is still numpy: arrival order IS
    # the stream order, and sorting here lets the file writer use zero-copy
    # slices (an Arrow-level take on >2 GB of strings overflows offsets).
    order = np.argsort(arrival, kind="stable")
    conv_ids, turn_idx, roles = conv_ids[order], turn_idx[order], roles[order]
    texts, tools, ts, arrival = texts[order], tools[order], ts[order], arrival[order]
    return pa.table(
        {
            "conv_id": pa.array(conv_ids, pa.string()),
            "turn_idx": pa.array(turn_idx, pa.int32()),
            "role": pa.array(roles, pa.string()),
            "text": pa.array(texts, pa.string()),
            "tool": pa.array(tools, pa.string()),
            "ts": pa.array(ts.astype(np.int64), pa.timestamp("us")),
            "arrival_us": pa.array(arrival.astype(np.int64), pa.int64()),
        }
    )


def write_transcripts(
    table: pa.Table, out_dir: str, num_files: int = 8, split_by: str = "ts"
) -> list[str]:
    """Write a fixture as multi-file Parquet (FIXTURES.md F1).

    ``split_by="ts"`` (default): files are equal row-count bands of ARRIVAL
    order (the ``arrival_us`` column when present, else ``ts``) — the
    realistic arrival stream, where conversations span many files/epochs and
    backward-shifted ``ts`` rows arrive at their original position (so they
    are genuinely late at ingest).  ``split_by="conv"``: conv_id hash ranges
    (each conversation wholly inside one file).  ``arrival_us`` is dropped
    from the written files — the on-disk schema is the canonical 6 columns.
    """
    import os

    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    if split_by == "ts":
        order_col = "arrival_us" if "arrival_us" in table.column_names else "ts"
        key = table[order_col].cast(pa.int64()).to_numpy()
        bounds = np.linspace(0, len(table), num_files + 1).astype(np.int64)
        if np.all(key[1:] >= key[:-1]):
            # already arrival-sorted (generate_transcripts_fast) → zero-copy
            subs = [table.slice(bounds[f], bounds[f + 1] - bounds[f])
                    for f in range(num_files)]
        else:
            order = np.argsort(key, kind="stable")
            # per-file takes: a single whole-table gather overflows 32-bit
            # string offsets beyond ~2 GB of text
            subs = [table.take(pa.array(order[bounds[f]:bounds[f + 1]]))
                    for f in range(num_files)]
    else:
        conv = table["conv_id"].to_pylist()
        assign = np.array([hash_conv(c) % num_files for c in conv], dtype=np.int32)
        subs = [table.filter(pa.array(assign == f)) for f in range(num_files)]
    paths = []
    for f, sub in enumerate(subs):
        if "arrival_us" in sub.column_names:
            sub = sub.drop_columns(["arrival_us"])
        path = os.path.join(out_dir, f"part-{f:05d}.parquet")
        pq.write_table(sub, path)
        paths.append(path)
    return paths


def hash_conv(conv_id: str) -> int:
    """Stable (process-independent) conversation-key hash for partitioning."""
    import zlib

    return zlib.crc32(conv_id.encode("utf-8"))
