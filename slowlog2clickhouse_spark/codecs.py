"""Vendored minimal image codec — pure-Python PGM (P5) encode/decode.

Purpose (VERDICT r6 #5): the multimodal ops' real-codec branch
(`decode_image` / `resize_image` with a non-"fake/v1" codec) used to be
reachable only with PIL installed, leaving the branch untested in this
container. PGM "P5" is a trivial, fully-public format (header
``P5\\n<w> <h>\\n<maxval>\\n`` + raw bytes, netpbm spec), so a complete
encoder/decoder fits in ~60 lines of stdlib+numpy — enough to exercise
the whole decode→histogram and decode→resize→re-encode paths in-sandbox
with zero dependencies. Real deployments still hand png/jpeg/webp to
PIL; "image/pgm" is handled here either way.

Only 8-bit grayscale (maxval ≤ 255) is supported — exactly what the
luminance-histogram feature contract needs.
"""

from __future__ import annotations

import numpy as np

PGM_CODEC = "image/x-portable-graymap"  # canonical PGM MIME type


def encode_pgm(arr: np.ndarray) -> bytes:
    """(h, w) uint8 array → binary PGM (P5) bytes."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim != 2:
        raise ValueError(f"PGM is 2-D grayscale; got shape {a.shape}")
    h, w = a.shape
    return f"P5\n{w} {h}\n255\n".encode("ascii") + a.tobytes()


def _read_token(buf: bytes, pos: int) -> tuple[bytes, int]:
    """Next whitespace-delimited token, skipping '#' comments (netpbm
    headers allow comments anywhere between tokens)."""
    n = len(buf)
    while pos < n:
        c = buf[pos : pos + 1]
        if c.isspace():
            pos += 1
        elif c == b"#":
            while pos < n and buf[pos : pos + 1] != b"\n":
                pos += 1
        else:
            break
    start = pos
    while pos < n and not buf[pos : pos + 1].isspace():
        pos += 1
    if start == pos:
        raise ValueError("truncated PGM header")
    return buf[start:pos], pos


def decode_pgm(payload: bytes) -> np.ndarray:
    """Binary PGM (P5) bytes → (h, w) uint8 array."""
    magic, pos = _read_token(payload, 0)
    if magic != b"P5":
        raise ValueError(f"not a binary PGM (magic {magic!r}, want b'P5')")
    w_tok, pos = _read_token(payload, pos)
    h_tok, pos = _read_token(payload, pos)
    max_tok, pos = _read_token(payload, pos)
    w, h, maxval = int(w_tok), int(h_tok), int(max_tok)
    if w <= 0 or h <= 0:
        # a 0-dim image passes the raster-length check with 0 bytes but
        # crashes every consumer (resize reshapes a fixed 32x32) — fail
        # here with a codec error, not downstream with a numpy one
        raise ValueError(f"degenerate PGM dimensions {w}x{h}")
    if not (0 < maxval <= 255):
        raise ValueError(f"only 8-bit PGM supported (maxval {maxval})")
    pos += 1  # exactly ONE whitespace byte separates header from raster
    raster = payload[pos : pos + w * h]
    if len(raster) != w * h:
        raise ValueError(
            f"PGM raster truncated: want {w * h} bytes, have {len(raster)}"
        )
    return np.frombuffer(raster, dtype=np.uint8).reshape(h, w)
