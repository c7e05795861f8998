"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are opaque ``binary`` columns with metadata
columns next to them; decode / feature-extraction runs as an actor-pool
``map_batches`` stage with SMALL batches (large rows!).  Real decodes are
dependency-free: audio as a zero-copy int16 PCM view
(:class:`PcmWindowEnergy`), images via the pure-numpy PPM/BMP codecs and
the stdlib-zlib PNG codec (:mod:`..functions.imagecodec`) behind
``real=True`` on the featurize / resize stages; JPEG (would need PIL/a DCT
stack) falls back to the deterministic byte-derived fake (``real=False``,
the default, which is also the SQL-oracle-able mode).
"""

from __future__ import annotations

import hashlib
import zlib

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data


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

    ``real=True`` DECODES the payload — pure-numpy PPM(P6)/BMP(24-bit)
    codecs (:mod:`..functions.imagecodec`), no PIL needed — and emits the
    image's true ``width``/``height`` plus ``mean_lum`` (ITU-R 601 luma
    mean of the decoded pixels).  The default deterministic fake derives
    the same columns purely from the bytes so the full pipeline remains
    SQL-oracle-able: ``width = n_bytes % 64 + 1``, ``height = n_bytes %
    37 + 1``, ``mean_lum = crc32 % 256``.  Both modes share a schema:
    ``(doc_id, n_bytes, checksum, width, height, crc32, mean_lum)``.
    """

    def __init__(self, real: bool = False) -> None:
        self.real = real

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        payloads = batch["payload"]
        n_bytes = payloads.map(len).to_numpy(np.int64)
        checksum = payloads.map(lambda b: hashlib.md5(b).hexdigest())
        crc = payloads.map(lambda b: zlib.crc32(b)).to_numpy(np.int64)
        if self.real:
            from ..functions.imagecodec import decode_image

            widths = np.empty(len(payloads), np.int64)
            heights = np.empty(len(payloads), np.int64)
            lum = np.empty(len(payloads), np.float64)
            for i, b in enumerate(payloads):
                img = decode_image(bytes(b))
                heights[i], widths[i] = img.shape[:2]
                f = img.astype(np.float64)
                lum[i] = (0.299 * f[:, :, 0] + 0.587 * f[:, :, 1]
                          + 0.114 * f[:, :, 2]).mean()
            lum = np.round(lum, 6)
        else:
            widths = n_bytes % 64 + 1
            heights = n_bytes % 37 + 1
            lum = (crc % 256).astype(np.float64)
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"].to_numpy(np.int64),
                "n_bytes": n_bytes,
                "checksum": checksum.to_numpy(),
                "width": widths,
                "height": heights,
                "crc32": crc,
                "mean_lum": lum,
            }
        )


def multimodal_features(sf_dir: str, concurrency: int = 2, batch_size: int = 256):
    """payloads → actor-pool featurize.  Small batch_size on purpose: binary
    rows are big; batch × concurrency must fit the worker heap."""
    ds = payloads_from_documents(sf_dir)
    return ds.map_batches(PayloadFeaturizer, batch_format="pandas",
                          batch_size=batch_size, concurrency=concurrency)


def image_payloads_from_documents(sf_dir: str, fmt: str = "mixed"):
    """Deterministic REAL-image payload table: one synthetic PPM, BMP or
    PNG per doc_id (seeded gradient, dimensions a function of the id — see
    :func:`..functions.imagecodec.synthetic_image`).  ``fmt='mixed'``
    rotates formats by ``id % 3`` (ppm/bmp/png) so all three codecs —
    including PNG Paeth unfiltering — are exercised in one table."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id"])

    def to_img(t: pa.Table) -> pa.Table:
        from ..functions.imagecodec import synthetic_image

        ids = t["doc_id"].to_pylist()
        fmts = [("ppm", "bmp", "png")[i % 3] for i in ids] \
            if fmt == "mixed" else [fmt] * len(ids)
        payload = pa.array([synthetic_image(i, f)
                            for i, f in zip(ids, fmts)], pa.binary())
        return pa.table({"doc_id": t["doc_id"], "payload": payload,
                         "media_type": pa.array([f"image/{f}" for f in fmts])})

    return ds.map_batches(to_img, batch_format="pyarrow",
                          zero_copy_batch=True)


def image_features(sf_dir: str, concurrency: int = 2, batch_size: int = 256):
    """REAL image decode end-to-end: synthetic PPM/BMP/PNG payloads → actor-pool
    :class:`PayloadFeaturizer(real=True)` → true (width, height) from the
    decoded pixels plus mean luma.  The dimensions are id-derived, so the
    (doc_id, width, height) projection is SQL-oracle-able — the oracle
    checks that encode→decode recovered the true geometry; mean_lum is
    numpy-golden-tested (pixel math is non-SQL)."""
    ds = image_payloads_from_documents(sf_dir, fmt="mixed")
    return ds.map_batches(PayloadFeaturizer,
                          fn_constructor_kwargs={"real": True},
                          batch_format="pandas", batch_size=batch_size,
                          concurrency=concurrency)


def image_resized_features(sf_dir: str, width: int = 16, height: int = 12,
                           concurrency: int = 2, batch_size: int = 256):
    """featurize(real) ∘ resize(real): synthetic payloads → nearest-neighbor
    resize (decode → index-grid resample → PPM re-encode) → featurize the
    RESIZED payloads.  Every surviving row must report the target geometry —
    the (doc_id, width, height) projection is constant-oracle-able.

    Both actor pools autoscale from 1 (``concurrency=(1, N)``): two fixed
    pools of N each would reserve 2N CPUs up front and starve the upstream
    read tasks into a scheduling deadlock on small clusters (observed on
    the 4-CPU test session)."""
    ds = image_payloads_from_documents(sf_dir, fmt="mixed")
    resized = ds.map_batches(
        PayloadResizer,
        fn_constructor_kwargs={"width": width, "height": height, "real": True},
        batch_format="pandas", batch_size=batch_size,
        concurrency=(1, concurrency))
    return resized.map_batches(PayloadFeaturizer,
                               fn_constructor_kwargs={"real": True},
                               batch_format="pandas", batch_size=batch_size,
                               concurrency=(1, concurrency))


class PayloadResizer:
    """Actor-pool resize stage.

    ``real=True`` decodes the payload (pure-numpy PPM/BMP, stdlib-zlib PNG), nearest-
    neighbor-resizes to ``width × height`` via integer index grids, and
    re-encodes as PPM — an actual pixels-in/pixels-out resize with no
    external libs.  The deterministic fake tiles the source bytes to
    exactly ``width × height`` bytes; both modes share the output schema
    ``(doc_id, payload, width, height)``."""

    def __init__(self, width: int = 32, height: int = 32, real: bool = False) -> None:
        self.width, self.height = width, height
        self.real = real

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        target = self.width * self.height

        def tile(b: bytes) -> bytes:
            if not b:
                return b"\x00" * target
            reps = target // len(b) + 1
            return (b * reps)[:target]

        if self.real:
            from ..functions.imagecodec import (decode_image, encode_ppm,
                                                resize_nearest)

            def real_resize(b: bytes) -> bytes:
                return encode_ppm(resize_nearest(decode_image(bytes(b)),
                                                 self.width, self.height))

            payload = batch["payload"].map(real_resize)
        else:
            payload = batch["payload"].map(tile)
        return pd.DataFrame({
            "doc_id": batch["doc_id"].to_numpy(np.int64),
            "payload": payload,
            "width": np.full(len(batch), self.width, dtype=np.int32),
            "height": np.full(len(batch), self.height, dtype=np.int32),
        })


FRAME_BYTES = 4096


class FrameSampler:
    """Actor-pool frame-sampling stage (video analog): the payload is framed
    into ``frame_bytes`` chunks and every ``every_n``-th frame is emitted as
    its OWN ROW — the 1→N binary row expansion a video pipeline needs."""

    def __init__(self, every_n: int = 2, frame_bytes: int = FRAME_BYTES) -> None:
        if every_n < 1 or frame_bytes < 1:
            raise ValueError("every_n and frame_bytes must be >= 1")
        self.every_n = every_n
        self.frame_bytes = frame_bytes

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        fb = self.frame_bytes
        docs, idxs, lens, crcs = [], [], [], []
        for doc, b in zip(batch["doc_id"].to_numpy(np.int64), batch["payload"]):
            n_frames = (len(b) + fb - 1) // fb
            for i in range(0, n_frames, self.every_n):
                fr = b[i * fb:(i + 1) * fb]
                docs.append(doc)
                idxs.append(i)
                lens.append(len(fr))
                crcs.append(zlib.crc32(fr))
        return pd.DataFrame({
            "doc_id": np.array(docs, dtype=np.int64),
            "frame_idx": np.array(idxs, dtype=np.int64),
            "frame_len": np.array(lens, dtype=np.int64),
            "frame_crc32": np.array(crcs, dtype=np.int64),
        })


def multimodal_frames(sf_dir: str, every_n: int = 2, concurrency: int = 2,
                      batch_size: int = 256):
    """payloads → actor-pool frame sampling.  Frame geometry (doc_id,
    frame_idx, frame_len) is SQL-expressible and oracle-checked; the
    per-frame crc32 rides along for downstream dedup."""
    ds = payloads_from_documents(sf_dir)
    return ds.map_batches(FrameSampler,
                          fn_constructor_kwargs={"every_n": every_n},
                          batch_format="pandas", batch_size=batch_size,
                          concurrency=concurrency)


class PcmWindowEnergy:
    """Actor-pool audio-feature stage with a REAL decode (unlike the
    PIL-gated image stages): the payload bytes are interpreted as
    little-endian int16 PCM via a zero-copy ``np.frombuffer`` view — no
    external audio lib needed — and each fixed ``window``-sample window
    emits one row of (rms, peak) energy features, the VAD/loudness
    primitive of an audio data pipeline.

    A trailing odd byte is dropped (not a full sample); the final partial
    window is averaged over its true sample count.  Per-window sums are one
    ``np.add.reduceat`` over the squared signal — the per-row loop touches
    payload OBJECTS only (large binary rows, small batches — same shape as
    :class:`FrameSampler`), never samples."""

    def __init__(self, window: int = 256) -> None:
        if window < 1:
            raise ValueError("window must be >= 1")
        self.window = window

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        w = self.window
        docs, widx, ns, rms, peak = [], [], [], [], []
        for doc, b in zip(batch["doc_id"].to_numpy(np.int64),
                          batch["payload"]):
            x = np.frombuffer(b[:len(b) // 2 * 2], dtype="<i2")
            if not len(x):
                continue
            bounds = np.arange(0, len(x), w, dtype=np.int64)
            sq = x.astype(np.float64) ** 2
            sums = np.add.reduceat(sq, bounds)
            counts = np.diff(np.append(bounds, len(x)))
            mx = np.maximum.reduceat(np.abs(x.astype(np.int64)), bounds)
            docs.append(np.full(len(bounds), doc, dtype=np.int64))
            widx.append(np.arange(len(bounds), dtype=np.int64))
            ns.append(counts)
            rms.append(np.sqrt(sums / counts))
            peak.append(mx)
        if not docs:
            return pd.DataFrame({
                "doc_id": pd.Series([], dtype=np.int64),
                "window_idx": pd.Series([], dtype=np.int64),
                "n_samples": pd.Series([], dtype=np.int64),
                "rms": pd.Series([], dtype=float),
                "peak": pd.Series([], dtype=np.int64)})
        return pd.DataFrame({
            "doc_id": np.concatenate(docs),
            "window_idx": np.concatenate(widx),
            "n_samples": np.concatenate(ns),
            "rms": np.round(np.concatenate(rms), 6),
            "peak": np.concatenate(peak)})


def audio_window_energy(sf_dir: str, window: int = 256, concurrency: int = 2,
                        batch_size: int = 256):
    """payloads → actor-pool PCM windowed energy (REAL binary decode).
    ORACLE-gated: DuckDB has no blob indexing, but ``hex(blob)`` + substr
    recovers each little-endian int16 sample, and the per-window sum of
    integer squares stays < 2^53 so the float64 energy is exact on both
    sides (queries.oracle_sql['audio_window_energy'])."""
    ds = payloads_from_documents(sf_dir)
    return ds.map_batches(PcmWindowEnergy,
                          fn_constructor_kwargs={"window": window},
                          batch_format="pandas", batch_size=batch_size,
                          concurrency=concurrency)
