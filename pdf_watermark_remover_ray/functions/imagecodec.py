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


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def encode_png(img: np.ndarray, filter_id: int = 0) -> bytes:
    """(h, w, 3) uint8 RGB → PNG (8-bit truecolor, one IDAT).

    Public format (RFC 2083 / the W3C PNG spec); stdlib zlib + binascii
    only.  ``filter_id`` applies the same scanline filter (0=None, 1=Sub,
    2=Up, 3=Average, 4=Paeth) to every row — filtering on the ENCODE side
    is the non-sequential direction (every predictor reads raw neighbor
    pixels), so it stays whole-image vectorized; Paeth typically halves the
    IDAT for the smooth synthetic gradients."""
    import binascii
    import zlib

    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError("encode_png needs an (h, w, 3) array")
    if filter_id not in (0, 1, 2, 3, 4):
        raise ValueError("filter_id must be 0..4")
    h, w = img.shape[:2]

    def chunk(tag: bytes, data: bytes) -> bytes:
        crc = binascii.crc32(tag + data) & 0xFFFFFFFF
        return struct.pack(">I", len(data)) + tag + data + struct.pack(">I", crc)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit RGB
    flat = img.reshape(h, w * 3)
    if filter_id == 0:
        filt = flat
    else:
        left = np.zeros_like(flat)
        left[:, 3:] = flat[:, :-3]                      # a: pixel to the left
        up = np.zeros_like(flat)
        up[1:] = flat[:-1]                              # b: pixel above
        upleft = np.zeros_like(flat)
        upleft[1:, 3:] = flat[:-1, :-3]                 # c: above-left
        if filter_id == 1:
            pred = left
        elif filter_id == 2:
            pred = up
        elif filter_id == 3:
            pred = ((left.astype(np.int16) + up) // 2).astype(np.uint8)
        else:
            pred = _paeth(left, up, upleft)
        filt = flat - pred                              # uint8 wraparound
    raw = np.concatenate([np.full((h, 1), filter_id, np.uint8), filt],
                         axis=1).tobytes()
    return (_PNG_SIG + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw))
            + chunk(b"IEND", b""))


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Paeth predictor (PNG spec §6.6), vectorized over one scanline."""
    a16 = a.astype(np.int16)
    b16 = b.astype(np.int16)
    c16 = c.astype(np.int16)
    p = a16 + b16 - c16
    pa_, pb, pc_ = np.abs(p - a16), np.abs(p - b16), np.abs(p - c16)
    return np.where((pa_ <= pb) & (pa_ <= pc_), a,
                    np.where(pb <= pc_, b, c))


def decode_png(b: bytes) -> np.ndarray:
    """PNG → (h, w, 3) uint8 RGB: stdlib-zlib inflate + hybrid unfiltering.

    Supports the non-interlaced 8-bit color types the multimodal corpora
    use — truecolor (2), truecolor+alpha (6, alpha dropped), grayscale (0,
    replicated to RGB).  All five scanline filters per the public spec.
    None/Up rows are whole-row numpy; Sub/Average/Paeth recur along x, so
    those rows run as scalar bytearray loops — per-byte int ops cost ~0.3µs
    vs ~2µs per 3-wide numpy slice op, making the scalar path ~12x faster
    at any width (the "vectorization" would only ever span one pixel)."""
    import zlib

    if b[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, ihdr, idat = 8, None, []
    while pos + 8 <= len(b):
        (ln,) = struct.unpack_from(">I", b, pos)
        tag = b[pos + 4 : pos + 8]
        data = b[pos + 8 : pos + 8 + ln]
        pos += 12 + ln  # length + tag + data + crc
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif tag == b"IDAT":
            idat.append(data)
        elif tag == b"IEND":
            break
    if ihdr is None or not idat:
        raise ValueError("truncated PNG (missing IHDR/IDAT)")
    w, h, depth, ctype, comp, filt, interlace = ihdr
    if depth != 8 or comp != 0 or filt != 0 or interlace != 0:
        raise ValueError("only 8-bit non-interlaced PNG is supported")
    ch = {0: 1, 2: 3, 6: 4}.get(ctype)
    if ch is None:
        raise ValueError(f"unsupported PNG color type {ctype}")
    raw = zlib.decompress(b"".join(idat))
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG pixel data does not match IHDR geometry")
    out = bytearray(h * stride)
    prev = bytes(stride)
    for y in range(h):
        off = y * (stride + 1)
        f = raw[off]
        row = raw[off + 1 : off + 1 + stride]
        if f == 0:
            cur = row
        elif f == 2:  # Up: whole-row vectorized
            cur = (np.frombuffer(row, np.uint8)
                   + np.frombuffer(prev, np.uint8)).tobytes()
        elif f in (1, 3, 4):
            cur = bytearray(row)
            if f == 1:  # Sub
                for x in range(ch, stride):
                    cur[x] = (cur[x] + cur[x - ch]) & 255
            elif f == 3:  # Average
                for x in range(stride):
                    a = cur[x - ch] if x >= ch else 0
                    cur[x] = (cur[x] + ((a + prev[x]) >> 1)) & 255
            else:  # Paeth (spec §6.6)
                for x in range(stride):
                    a = cur[x - ch] if x >= ch else 0
                    c = prev[x - ch] if x >= ch else 0
                    up = prev[x]
                    p = a + up - c
                    pa, pb, pc_ = abs(p - a), abs(p - up), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc_) else \
                        (up if pb <= pc_ else c)
                    cur[x] = (cur[x] + pred) & 255
            cur = bytes(cur)
        else:
            raise ValueError(f"unknown PNG filter {f}")
        out[y * stride : (y + 1) * stride] = cur
        prev = cur
    px = np.frombuffer(bytes(out), np.uint8).reshape(h, w, ch)
    if ctype == 0:
        return np.repeat(px, 3, axis=2).copy()
    return px[:, :, :3].copy()


def decode_image(b: bytes) -> np.ndarray:
    """Sniff the payload magic and decode → (h, w, 3) uint8 RGB."""
    if b[:2] == b"P6":
        return decode_ppm(b)
    if b[:2] == b"BM":
        return decode_bmp(b)
    if b[:8] == _PNG_SIG:
        return decode_png(b)
    raise ValueError(
        "unknown image payload (supported: PPM P6, 24-bit BMP, 8-bit PNG)")


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
    if fmt == "bmp":
        return encode_bmp(img)
    if fmt == "png":
        return encode_png(img, filter_id=4)  # Paeth: exercises the decoder's
        #                                      hardest unfiltering path
    return encode_ppm(img)
