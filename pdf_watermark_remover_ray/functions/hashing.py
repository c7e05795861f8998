"""SQL-reproducible vectorized hashing helpers.

Every operator that must face a DuckDB value-hash oracle derives its hashes
from md5 hex prefixes, because DuckDB can compute the identical value
(``('0x' || substring(md5(s), 1, N))::BIGINT/UBIGINT``).  Callers factorize
their inputs first so md5 runs once per UNIQUE string per batch, keeping the
per-row cost amortized; operators with no oracle exposure are free to use
``pd.util.hash_pandas_object`` instead (e.g. exact_dedup, partitioning).
"""

from __future__ import annotations

import hashlib

import numpy as np


def md5_u32(strings) -> np.ndarray:
    """First 4 bytes of md5 as int64 (< 2^32) — SQL:
    ``('0x' || substring(md5(s), 1, 8))::BIGINT``."""
    return np.fromiter(
        (int(hashlib.md5(s.encode("utf-8")).hexdigest()[:8], 16) for s in strings),
        dtype=np.int64, count=len(strings))


def md5_u64(strings) -> np.ndarray:
    """First 8 bytes of md5 as uint64 — SQL:
    ``('0x' || substring(md5(s), 1, 16))::UBIGINT``."""
    return np.fromiter(
        (int(hashlib.md5(s.encode("utf-8")).hexdigest()[:16], 16) for s in strings),
        dtype=np.uint64, count=len(strings))
