"""Delta + variable-byte codec — numpy-vectorized.

Same wire format as the reference's compression layer
(``utility/.../compression/VByte.java:11-47``,
``utility/.../buffer/CompressedByteBuffer.java:49-67``): values are split
into 7-bit groups, least-significant first; the final byte of each value
has the high bit set (terminator). Doc ids are d-gapped before encoding
(``core/.../index/disk/PositionIndexWriter.java:326-358``).

Everything here is a pure function of numpy arrays — no Python-per-value
loops (the loops below iterate over *byte positions*, bounded by 10).
These run inside Arrow-batched ``applyInPandas`` kernels, so encode/decode
cost is amortized over whole posting blocks.
"""

from __future__ import annotations

import numpy as np

_MAX_VBYTE_LEN = 10  # 64 bits / 7 bits-per-byte


def vbyte_encode(values: np.ndarray) -> bytes:
    """Encode a uint64 array into Galago-style vbyte (hi-bit terminator)."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    if v.size == 0:
        return b""
    # byte length per value: number of 7-bit groups
    lengths = np.ones(v.shape, dtype=np.int64)
    probe = v >> np.uint64(7)
    while probe.any():
        lengths += (probe != 0).astype(np.int64)
        probe >>= np.uint64(7)
    ends = np.cumsum(lengths)
    starts = ends - lengths
    out = np.zeros(int(ends[-1]), dtype=np.uint8)
    max_len = int(lengths.max())
    for j in range(max_len):
        mask = lengths > j
        chunk = (v[mask] >> np.uint64(7 * j)) & np.uint64(0x7F)
        out[starts[mask] + j] = chunk.astype(np.uint8)
    out[ends - 1] |= 0x80  # terminator on each value's final byte
    return out.tobytes()


def vbyte_decode(buf: bytes | np.ndarray) -> np.ndarray:
    """Decode a vbyte buffer back into a uint64 array."""
    arr = np.frombuffer(buf, dtype=np.uint8) if isinstance(buf, (bytes, bytearray)) else np.asarray(buf, dtype=np.uint8)
    if arr.size == 0:
        return np.empty(0, dtype=np.uint64)
    ends = np.flatnonzero(arr & 0x80)
    starts = np.concatenate(([0], ends[:-1] + 1))
    lengths = ends - starts + 1
    out = np.zeros(ends.shape, dtype=np.uint64)
    for j in range(int(lengths.max())):
        mask = lengths > j
        b = arr[starts[mask] + j].astype(np.uint64) & np.uint64(0x7F)
        out[mask] |= b << np.uint64(7 * j)
    return out


def delta_encode(sorted_values: np.ndarray) -> np.ndarray:
    """D-gap a sorted uint64 array: out[0] absolute, rest first differences."""
    v = np.ascontiguousarray(sorted_values, dtype=np.uint64)
    if v.size == 0:
        return v
    out = np.empty_like(v)
    out[0] = v[0]
    np.subtract(v[1:], v[:-1], out=out[1:])
    return out


def delta_decode(gaps: np.ndarray) -> np.ndarray:
    """Invert :func:`delta_encode` (prefix sum)."""
    g = np.ascontiguousarray(gaps, dtype=np.uint64)
    return np.cumsum(g, dtype=np.uint64)


def encode_doc_block(docs: np.ndarray) -> bytes:
    """Sorted doc ids -> d-gap + vbyte bytes."""
    return vbyte_encode(delta_encode(docs))


def decode_doc_block(buf: bytes) -> np.ndarray:
    return delta_decode(vbyte_decode(buf))


def encode_positions_block(pos_concat: np.ndarray, counts: np.ndarray) -> bytes:
    """Per-doc position lists (concatenated ascending runs; ``counts`` =
    positions per doc) -> within-doc d-gap + vbyte — the position payload
    of PositionIndexWriter (``PositionIndexWriter.java:326-358``: first
    position absolute, rest gaps, per document)."""
    p = np.ascontiguousarray(pos_concat, dtype=np.uint64)
    if p.size == 0:
        return b""
    gaps = np.empty_like(p)
    gaps[0] = p[0]
    np.subtract(p[1:], p[:-1], out=gaps[1:])
    cnts = np.asarray(counts, dtype=np.int64)
    starts = np.concatenate(([0], np.cumsum(cnts)[:-1]))
    # a zero-count doc contributes no positions: its start aliases the next
    # doc's (harmless) or points past the buffer (trailing zero) — mask it
    # out so the encoder tolerates the same inputs the decoder does
    starts = starts[cnts > 0]
    gaps[starts] = p[starts]  # each doc's first position stays absolute
    return vbyte_encode(gaps)


def decode_positions_block(buf: bytes, counts: np.ndarray) -> np.ndarray:
    """Invert :func:`encode_positions_block`: returns the concatenated
    absolute positions (caller re-splits by ``counts``)."""
    gaps = vbyte_decode(buf)
    if gaps.size == 0:
        return gaps
    cnts = np.asarray(counts, dtype=np.int64)
    cs = np.cumsum(gaps, dtype=np.uint64)
    starts = np.concatenate(([0], np.cumsum(cnts)[:-1]))
    base = np.zeros(len(starts), dtype=np.uint64)
    if len(starts) > 1:
        s = starts[1:]
        # a LEADING zero-count doc gives start 0 for its successor — its
        # base is 0, not cs[-1] (the -1 index would wrap to the last gap)
        base[1:] = np.where(s > 0, cs[np.maximum(s, 1) - 1], 0)
    return cs - np.repeat(base, cnts)
