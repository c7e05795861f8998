"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are opaque ``binary`` columns with metadata
columns next to them; decode / feature-extraction runs as an actor-pool
``map_batches`` stage with SMALL batches (large rows!).  The decode libraries
(PIL / ffmpeg / torchaudio) are not in this container, so the real decoder is
gated behind an import-try and STUBBED with a deterministic fake — the
Ray-side plumbing (schema, batch sizing, actor signature, output layout) is
real and tested.
"""

from __future__ import annotations

import hashlib
import zlib

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

try:  # real decoder, if ever available
    from PIL import Image  # noqa: F401

    _HAVE_PIL = True
except ImportError:
    _HAVE_PIL = False


def payloads_from_documents(sf_dir: str):
    """Synthesize an opaque binary-payload table from ``documents`` (stand-in
    for an image/audio column; UTF-8 bytes of the text as the payload)."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def to_payload(t: pa.Table) -> pa.Table:
        texts = t["text"].to_pylist()
        payload = pa.array([(s or "").encode("utf-8") for s in texts], pa.binary())
        return pa.table({"doc_id": t["doc_id"], "payload": payload,
                         "media_type": pa.array(["image/fake"] * len(t))})

    return ds.map_batches(to_payload, batch_format="pyarrow", zero_copy_batch=True)


class PayloadFeaturizer:
    """Actor-pool decode/feature stage.

    ``real=True`` requires an actual decoder (PIL) → NotImplementedError in
    this container; the default deterministic fake derives features purely
    from the bytes so the full pipeline remains testable and SQL-oracle-able:
    ``n_bytes``, ``checksum`` (md5 hex), ``width = n_bytes % 64 + 1``,
    ``height = n_bytes % 37 + 1``, ``crc32``.
    """

    def __init__(self, real: bool = False) -> None:
        if real and not _HAVE_PIL:
            raise NotImplementedError(
                "real image decode requires PIL, which is not available in this "
                "container — run with real=False for the deterministic fake"
            )
        self.real = real

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        payloads = batch["payload"]
        n_bytes = payloads.map(len).to_numpy(np.int64)
        checksum = payloads.map(lambda b: hashlib.md5(b).hexdigest())
        crc = payloads.map(lambda b: zlib.crc32(b)).to_numpy(np.int64)
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"].to_numpy(np.int64),
                "n_bytes": n_bytes,
                "checksum": checksum.to_numpy(),
                "width": (n_bytes % 64 + 1),
                "height": (n_bytes % 37 + 1),
                "crc32": crc,
            }
        )


def multimodal_features(sf_dir: str, concurrency: int = 2, batch_size: int = 256):
    """payloads → actor-pool featurize.  Small batch_size on purpose: binary
    rows are big; batch × concurrency must fit the worker heap."""
    ds = payloads_from_documents(sf_dir)
    return ds.map_batches(PayloadFeaturizer, batch_format="pandas",
                          batch_size=batch_size, concurrency=concurrency)
