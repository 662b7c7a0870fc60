"""Vectorized single-block MD5 over numpy arrays (RFC 1321, public).

VERDICT r10 #6: the Python DataSource's Arrow fast path built every
column vectorized EXCEPT the partition key -- one ``hashlib.md5`` call
per row, the last per-row Python call in the streaming data plane and
the named lever on the ~1.15x gap to the all-JVM ceiling.  hashlib has
no batch API and pyarrow.compute has no md5, so this module implements
the MD5 compression function itself as 64 rounds of numpy uint64
bitwise ops over the whole chunk at once.

Scope: inputs of <= 55 bytes (one 64-byte block after the 0x80 + length
padding) -- exactly the connector's ``pk-{shard}-{seq}`` keys.  Longer
input raises ValueError rather than silently producing a wrong digest.
Correctness is property-pinned against hashlib over random inputs
(tests/test_python_source.py).
"""

from __future__ import annotations

import math

import numpy as np

# Round constants K[i] = floor(abs(sin(i+1)) * 2^32) and the per-round
# left-rotate amounts, straight from RFC 1321.
_K = np.array(
    [int(abs(math.sin(i + 1)) * 2**32) & 0xFFFFFFFF for i in range(64)],
    dtype=np.uint64,
)
_S = np.array(
    [7, 12, 17, 22] * 4 + [5, 9, 14, 20] * 4 + [4, 11, 16, 23] * 4
    + [6, 10, 15, 21] * 4,
    dtype=np.uint64,
)
_MASK = np.uint64(0xFFFFFFFF)
_HEX = np.frombuffer(b"0123456789abcdef", dtype=np.uint8)


def md5_hex(data: np.ndarray, lens: np.ndarray | None = None) -> np.ndarray:
    """MD5 hex digests for a numpy bytes ('S') array of short strings.

    All inputs must be <= 55 bytes (single padded block).  Returns a
    numpy unicode array of 32-char lowercase hex digests, byte-identical
    to ``hashlib.md5(x).hexdigest()`` for every row.

    NUL caveat (ADVICE r11): numpy 'S' storage strips TRAILING NUL
    bytes, so an input that genuinely ends in b"\\x00" is
    unrepresentable once inside the array and the default char-count
    length would hash the truncated value -- a WRONG digest, not an
    error.  Text-like inputs (the connector's ``pk-{shard}-{seq}``
    keys) are unaffected; for arbitrary binary, pass the true byte
    lengths via ``lens``.  The detectable half of the ambiguity is
    guarded: when ``lens`` is omitted and NO row's inferred length
    reaches the itemsize, the dtype width cannot be explained by any
    stored row -- either a width-maximal value lost trailing NULs or
    the caller chose an over-wide dtype -- and this raises instead of
    guessing.  A non-maximal row ending in NUL stores identically to
    its stripped form (b"ab\\x00" == b"ab" in 'S4') and is
    UNDETECTABLE: callers hashing binary must pass ``lens``.
    """
    if data.dtype.kind != "S":
        raise ValueError(f"md5_hex expects a numpy 'S' bytes array, got {data.dtype}")
    n = data.shape[0]
    if n == 0:
        return np.empty(0, dtype="U32")
    width = data.dtype.itemsize
    if width > 55:
        raise ValueError(
            f"md5_hex is single-block only: max input width 55 bytes, got {width}"
        )
    if lens is None:
        # 'S' arrays NUL-pad to fixed width; char count recovers the length
        # for text-like inputs (see NUL caveat above).
        lens = np.char.str_len(data).astype(np.int64)
        if int(lens.max()) < width:
            raise ValueError(
                "md5_hex length inference is ambiguous: no row reaches the "
                f"array itemsize ({width}), so a width-maximal value may "
                "have lost trailing NUL bytes (or the dtype is over-wide). "
                "Pass explicit per-row byte lengths via lens="
            )
    else:
        lens = np.asarray(lens, dtype=np.int64)
        if lens.shape != (n,) or (lens < 0).any() or (lens > width).any():
            raise ValueError("lens must be per-row byte lengths within the array width")

    # Build the padded 64-byte block per row: message | 0x80 | zeros | bitlen.
    buf = np.zeros((n, 64), dtype=np.uint8)
    buf[:, :width] = np.frombuffer(
        data.tobytes(), dtype=np.uint8
    ).reshape(n, width)
    buf[np.arange(n), lens] = 0x80
    buf[:, 56:64] = (
        (lens * 8).astype("<u8").view(np.uint8).reshape(n, 8)
    )
    # The 16 little-endian uint32 message words, widened to uint64 so the
    # additions below wrap via an explicit mask instead of dtype overflow.
    m = buf.view("<u4").reshape(n, 16).astype(np.uint64)

    a = np.full(n, 0x67452301, dtype=np.uint64)
    b = np.full(n, 0xEFCDAB89, dtype=np.uint64)
    c = np.full(n, 0x98BADCFE, dtype=np.uint64)
    d = np.full(n, 0x10325476, dtype=np.uint64)
    a0, b0, c0, d0 = a.copy(), b.copy(), c.copy(), d.copy()

    for i in range(64):
        if i < 16:
            f = (b & c) | (~b & d)
            g = i
        elif i < 32:
            f = (d & b) | (~d & c)
            g = (5 * i + 1) % 16
        elif i < 48:
            f = b ^ c ^ d
            g = (3 * i + 5) % 16
        else:
            f = c ^ (b | (~d & _MASK))
            g = (7 * i) % 16
        x = (a + (f & _MASK) + _K[i] + m[:, g]) & _MASK
        s = _S[i]
        rot = ((x << s) | (x >> (np.uint64(32) - s))) & _MASK
        a, d, c, b = d, c, b, (b + rot) & _MASK

    out = np.empty((n, 4), dtype="<u4")
    out[:, 0] = (a0 + a) & _MASK
    out[:, 1] = (b0 + b) & _MASK
    out[:, 2] = (c0 + c) & _MASK
    out[:, 3] = (d0 + d) & _MASK
    dig = out.view(np.uint8).reshape(n, 16)

    hexbytes = np.empty((n, 32), dtype=np.uint8)
    hexbytes[:, 0::2] = _HEX[dig >> 4]
    hexbytes[:, 1::2] = _HEX[dig & 0x0F]
    return hexbytes.view("S32").reshape(n).astype("U32")
