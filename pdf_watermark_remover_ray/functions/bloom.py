"""Distributed Bloom filter build + broadcast probe.

The scale pattern this enables: a semijoin where the KEY side is too large
to broadcast exactly but a fixed-size bitmap summary of it is not.  The
bloom is built as a mergeable per-batch partial (each batch ORs its keys
into an m-bit bitmap; driver ORs the tiny bitmaps), broadcast once with
``ray.put``, and probed vectorized inside ``map_batches`` — a cheap
pre-filter that can only produce FALSE POSITIVES, so an exact verification
stage after it keeps results exact while the shuffle it feeds shrinks by
the filter's selectivity.  (Same role as a runtime join filter in a SQL
engine.)

No oracle exposure: correctness is carried by the exact verify stage, so
hashing is the vectorized splitmix64 double-hash (no per-row Python),
not an SQL-replayable md5.
"""

from __future__ import annotations

import numpy as np


def _splitmix64(x: np.ndarray) -> np.ndarray:
    z = x.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


class Bloom:
    """m-bit Bloom filter over int64 keys, k probes via Kirsch-Mitzenmacher
    double hashing (h1 + i*h2), all operations vectorized numpy."""

    def __init__(self, m_bits: int = 1 << 16, k: int = 4,
                 bits: np.ndarray | None = None) -> None:
        if m_bits % 8 != 0:  # config validation must survive python -O
            raise ValueError("m_bits must be a multiple of 8")
        self.m = m_bits
        self.k = k
        self.bits = np.zeros(m_bits // 8, np.uint8) if bits is None else bits

    def _positions(self, keys: np.ndarray) -> np.ndarray:
        """(k, n) bit positions per key."""
        u = keys.astype(np.uint64)
        h1 = _splitmix64(u)
        h2 = _splitmix64(u ^ np.uint64(0xA5A5A5A5A5A5A5A5)) | np.uint64(1)
        i = np.arange(self.k, dtype=np.uint64)[:, None]
        return ((h1[None, :] + i * h2[None, :]) % np.uint64(self.m))

    def add(self, keys: np.ndarray) -> None:
        pos = self._positions(keys).ravel()
        np.bitwise_or.at(self.bits, (pos >> np.uint64(3)).astype(np.int64),
                         np.uint8(1) << (pos & np.uint64(7)).astype(np.uint8))

    def contains(self, keys: np.ndarray) -> np.ndarray:
        """Vectorized membership mask (no false negatives)."""
        if len(keys) == 0:
            return np.zeros(0, bool)
        pos = self._positions(keys)
        byte = self.bits[(pos >> np.uint64(3)).astype(np.int64)]
        bit = (byte >> (pos & np.uint64(7)).astype(np.uint8)) & 1
        return bit.all(axis=0)

    def merge(self, other: "Bloom") -> "Bloom":
        self.bits |= other.bits
        return self


def bloom_from_dataset(ds, col: str, m_bits: int = 1 << 16, k: int = 4) -> Bloom:
    """Build a Bloom over ``ds[col]`` as a mergeable per-batch partial: each
    batch contributes one m-bit bitmap row; the driver ORs O(blocks) bitmaps
    (m/8 bytes each — the only data that ever leaves the key-side scan)."""
    import pandas as pd
    import pyarrow as pa

    def partial(t: pa.Table) -> pd.DataFrame:
        b = Bloom(m_bits, k)
        keys = t[col].to_pandas().dropna().to_numpy(np.int64)
        b.add(keys)
        return pd.DataFrame({"bits": [b.bits.tobytes()]})

    rows = ds.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True).to_pandas()
    out = Bloom(m_bits, k)
    for raw in rows["bits"]:
        out.bits |= np.frombuffer(raw, np.uint8)
    return out
