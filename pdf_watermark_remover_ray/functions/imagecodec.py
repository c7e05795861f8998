"""Dependency-free image codecs for the multimodal stages.

Two UNCOMPRESSED public formats, decoded/encoded with pure numpy — no PIL
in this container, and the multimodal actor stages need REAL bytes-in /
pixels-out behavior (mirroring the audio stage's zero-copy PCM view):

- PPM ``P6`` (netpbm): ASCII header ``P6 <w> <h> <maxval>`` (whitespace and
  ``#`` comments between tokens), then ``h*w*3`` raw RGB bytes.
- BMP 24-bit ``BI_RGB``: BITMAPFILEHEADER (14 bytes) + BITMAPINFOHEADER
  (40 bytes), bottom-up rows padded to 4 bytes, BGR pixel order.

Both decode to an ``(h, w, 3) uint8`` RGB array.  ``decode_image`` sniffs
the magic.  The formats are specs, not reference code: netpbm's man page
and the public BITMAPINFOHEADER layout.
"""

from __future__ import annotations

import struct

import numpy as np


def encode_ppm(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB → binary PPM (P6, maxval 255)."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError("encode_ppm needs an (h, w, 3) array")
    h, w = img.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + img.tobytes()


def decode_ppm(b: bytes) -> np.ndarray:
    """Binary PPM (P6) → (h, w, 3) uint8 RGB."""
    if b[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    # tokenize the header: after the magic, 3 ASCII ints separated by
    # whitespace, '#' starts a comment to end-of-line
    pos, tokens = 2, []
    while len(tokens) < 3:
        while pos < len(b) and b[pos : pos + 1].isspace():
            pos += 1
        if pos >= len(b):
            raise ValueError("truncated PPM header")
        if b[pos : pos + 1] == b"#":
            nl = b.find(b"\n", pos)
            pos = len(b) if nl < 0 else nl + 1
            continue
        start = pos
        while pos < len(b) and not b[pos : pos + 1].isspace():
            pos += 1
        tokens.append(int(b[start:pos]))
    pos += 1  # exactly ONE whitespace byte after maxval, per spec
    w, h, maxval = tokens
    if maxval != 255:
        raise ValueError(f"unsupported PPM maxval {maxval}")
    need = h * w * 3
    body = np.frombuffer(b, dtype=np.uint8, count=need, offset=pos)
    return body.reshape(h, w, 3).copy()


def encode_bmp(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB → 24-bit BI_RGB BMP (bottom-up, padded rows)."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError("encode_bmp needs an (h, w, 3) array")
    h, w = img.shape[:2]
    row_bytes = w * 3
    pad = (-row_bytes) % 4
    # bottom-up rows, BGR order, each padded to a 4-byte boundary
    bgr = img[::-1, :, ::-1]
    rows = np.zeros((h, row_bytes + pad), dtype=np.uint8)
    rows[:, :row_bytes] = bgr.reshape(h, row_bytes)
    body = rows.tobytes()
    offset = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", offset + len(body), 0, 0, offset)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body),
                       2835, 2835, 0, 0)
    return header + info + body


def decode_bmp(b: bytes) -> np.ndarray:
    """24-bit BI_RGB BMP → (h, w, 3) uint8 RGB (top-down output)."""
    if b[:2] != b"BM":
        raise ValueError("not a BMP payload")
    offset = struct.unpack_from("<I", b, 10)[0]
    (hdr_size, w, h, _planes, bitcount, compression) = struct.unpack_from(
        "<IiiHHI", b, 14)
    if hdr_size < 40 or bitcount != 24 or compression != 0:
        raise ValueError("only 24-bit BI_RGB BMP is supported")
    bottom_up = h > 0
    h = abs(h)
    row_bytes = w * 3
    stride = row_bytes + ((-row_bytes) % 4)
    rows = np.frombuffer(b, dtype=np.uint8, count=h * stride,
                         offset=offset).reshape(h, stride)
    bgr = rows[:, :row_bytes].reshape(h, w, 3)
    if bottom_up:
        bgr = bgr[::-1]
    return bgr[:, :, ::-1].copy()


def decode_image(b: bytes) -> np.ndarray:
    """Sniff the payload magic and decode → (h, w, 3) uint8 RGB."""
    if b[:2] == b"P6":
        return decode_ppm(b)
    if b[:2] == b"BM":
        return decode_bmp(b)
    raise ValueError("unknown image payload (supported: PPM P6, 24-bit BMP)")


def resize_nearest(img: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resize via integer index grids (pure numpy)."""
    h, w = img.shape[:2]
    ys = (np.arange(height, dtype=np.int64) * h) // height
    xs = (np.arange(width, dtype=np.int64) * w) // width
    return img[ys][:, xs]


def synthetic_image(doc_id: int, fmt: str = "ppm") -> bytes:
    """Deterministic per-doc image payload: a (doc_id-seeded) additive
    gradient, sized by doc_id so widths/heights vary across the corpus."""
    w = int(doc_id) % 24 + 8
    h = int(doc_id) % 16 + 8
    yy, xx = np.mgrid[0:h, 0:w]
    base = (yy * 7 + xx * 13 + int(doc_id)) % 256
    img = np.stack([base, (base * 2) % 256, (base * 3) % 256],
                   axis=2).astype(np.uint8)
    return encode_bmp(img) if fmt == "bmp" else encode_ppm(img)
