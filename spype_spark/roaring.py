"""Pure-Python Roaring bitmap codec — the serialization Delta Lake's
DELETION VECTORS ride on.

Two public layers, both open specs:

- the 32-bit Roaring bitmap **portable format**
  (github.com/RoaringBitmap/RoaringFormatSpec): a cookie header
  (12346 = no run containers + int32 container count; 12347 = run
  containers present, count-1 packed in the cookie's upper 16 bits,
  followed by a run-flag bitset), a descriptive header of (uint16
  key, uint16 cardinality-1) per container, an offset header (always
  with cookie 12346; with 12347 only when container count ≥ 4), then
  the containers in key order — ARRAY (sorted uint16 values, card ≤
  4096), BITMAP (8192 bytes = 2^16 bits), or RUN (uint16 n_runs then
  (start, length-1) pairs). This codec decodes all three and encodes
  array/bitmap (cookie 12346 — every portable reader accepts it);

- the 64-bit **RoaringBitmapArray** layout Delta's PROTOCOL.md
  specifies for deletion vectors: a 4-byte LE magic (1681511377),
  an 8-byte LE bitmap count, then per bitmap (in increasing key
  order) a 4-byte LE key (the value's high 32 bits) followed by one
  32-bit portable bitmap for the low 32 bits.

Values are row indexes; everything returns/accepts sorted Python
lists of non-negative ints (the fixture scale) or numpy arrays where
cheap. The DV FILE framing (1-byte version, per-DV big-endian size +
CRC-32) and Z85 path encoding live with the Delta log logic in
:mod:`spype_spark.delta_interop`, not here — this module is only the
bitmap mathematics.
"""

from __future__ import annotations

import struct
import sys

__all__ = [
    "serialize_bitmap32",
    "deserialize_bitmap32",
    "serialize_array64",
    "deserialize_array64",
    "MAGIC_ARRAY64",
]

_COOKIE_NO_RUN = 12346
_COOKIE_RUN = 12347
_NO_OFFSET_THRESHOLD = 4
_ARRAY_MAX = 4096
#: Delta PROTOCOL.md: magic number identifying the portable
#: RoaringBitmapArray serialization inside a deletion vector blob.
MAGIC_ARRAY64 = 1681511377


# ---------------------------------------------------------------------------
# 32-bit portable format
# ---------------------------------------------------------------------------


def serialize_bitmap32(values) -> bytes:
    """Serialize sorted non-negative ints < 2^32 into the portable
    format (cookie 12346: array/bitmap containers only — a layout
    every conforming reader must accept; runs are an encoder
    optimization the spec does not require)."""
    values = sorted(set(int(v) for v in values))
    if values and (values[0] < 0 or values[-1] >= 1 << 32):
        raise ValueError("bitmap32 values must be in [0, 2^32)")
    # bucket by high 16 bits
    containers: list[tuple[int, list[int]]] = []
    cur_key: int | None = None
    cur: list[int] = []
    for v in values:
        k = v >> 16
        if k != cur_key:
            if cur_key is not None:
                containers.append((cur_key, cur))
            cur_key, cur = k, []
        cur.append(v & 0xFFFF)
    if cur_key is not None:
        containers.append((cur_key, cur))
    n = len(containers)
    out = bytearray()
    out += struct.pack("<ii", _COOKIE_NO_RUN, n)
    for key, vals in containers:
        out += struct.pack("<HH", key, len(vals) - 1)
    # offset header (mandatory for cookie 12346)
    data_start = len(out) + 4 * n
    offsets = []
    pos = data_start
    blobs = []
    for _key, vals in containers:
        if len(vals) <= _ARRAY_MAX:
            blob = struct.pack(f"<{len(vals)}H", *vals)
        else:
            bits = bytearray(8192)
            for v in vals:
                bits[v >> 3] |= 1 << (v & 7)
            blob = bytes(bits)
        offsets.append(pos)
        pos += len(blob)
        blobs.append(blob)
    out += struct.pack(f"<{n}i", *offsets) if n else b""
    for blob in blobs:
        out += blob
    return bytes(out)


def deserialize_bitmap32(buf: bytes, base: int = 0) -> list[int]:
    """Decode one portable 32-bit bitmap starting at ``base``; returns
    the sorted values. (Stream-slicing callers that need the consumed
    byte count — the 64-bit array layout — use the private
    ``_deserialize_bitmap32``, which also returns it.)"""
    vals, _consumed = _deserialize_bitmap32(buf, base)
    return vals


def _deserialize_bitmap32(buf: bytes, base: int) -> tuple[list[int], int]:
    if len(buf) - base < 4:
        raise ValueError("truncated roaring bitmap (no cookie)")
    (cookie32,) = struct.unpack_from("<i", buf, base)
    cookie = cookie32 & 0xFFFF
    p = base + 4
    run_flags = b""
    if cookie == _COOKIE_RUN:
        n = ((cookie32 >> 16) & 0xFFFF) + 1
        nrb = (n + 7) // 8
        run_flags = buf[p:p + nrb]
        if len(run_flags) != nrb:
            raise ValueError("truncated roaring run-flag bitset")
        p += nrb
    elif cookie == _COOKIE_NO_RUN:
        (n,) = struct.unpack_from("<i", buf, p)
        p += 4
    else:
        raise ValueError(f"unknown roaring cookie {cookie}")
    keys_cards = []
    for i in range(n):
        key, cm1 = struct.unpack_from("<HH", buf, p)
        keys_cards.append((key, cm1 + 1))
        p += 4
    if cookie == _COOKIE_NO_RUN or n >= _NO_OFFSET_THRESHOLD:
        p += 4 * n  # offset header — containers follow in order anyway
    out: list[int] = []
    for i, (key, card) in enumerate(keys_cards):
        hi = key << 16
        is_run = bool(run_flags[i // 8] & (1 << (i % 8))) if run_flags else False
        if is_run:
            (n_runs,) = struct.unpack_from("<H", buf, p)
            p += 2
            for _ in range(n_runs):
                start, lm1 = struct.unpack_from("<HH", buf, p)
                p += 4
                out.extend(hi | v for v in range(start, start + lm1 + 1))
        elif card <= _ARRAY_MAX:
            vals = struct.unpack_from(f"<{card}H", buf, p)
            p += 2 * card
            out.extend(hi | v for v in vals)
        else:
            chunk = buf[p:p + 8192]
            if len(chunk) != 8192:
                raise ValueError("truncated roaring bitmap container")
            p += 8192
            for byte_i, b in enumerate(chunk):
                while b:
                    low = b & (-b)
                    out.append(hi | (byte_i << 3) | low.bit_length() - 1)
                    b ^= low
    return out, p - base


# ---------------------------------------------------------------------------
# 64-bit RoaringBitmapArray (Delta deletion-vector payload)
# ---------------------------------------------------------------------------


def serialize_array64(values) -> bytes:
    """Serialize sorted non-negative ints < 2^63 as the magic-prefixed
    portable RoaringBitmapArray Delta deletion vectors store."""
    values = sorted(set(int(v) for v in values))
    buckets: dict[int, list[int]] = {}
    for v in values:
        if v < 0:
            raise ValueError("array64 values must be non-negative")
        buckets.setdefault(v >> 32, []).append(v & 0xFFFFFFFF)
    out = bytearray(struct.pack("<iq", MAGIC_ARRAY64, len(buckets)))
    for key in sorted(buckets):
        out += struct.pack("<i", key)
        out += serialize_bitmap32(buckets[key])
    return bytes(out)


def deserialize_array64(buf: bytes) -> list[int]:
    if len(buf) < 12:
        raise ValueError("truncated RoaringBitmapArray (no header)")
    magic, n = struct.unpack_from("<iq", buf, 0)
    if magic != MAGIC_ARRAY64:
        raise ValueError(
            f"RoaringBitmapArray magic {magic} != {MAGIC_ARRAY64}"
        )
    p = 12
    out: list[int] = []
    for _ in range(n):
        (key,) = struct.unpack_from("<i", buf, p)
        p += 4
        vals, used = _deserialize_bitmap32(buf, p)
        p += used
        hi = key << 32
        out.extend(hi | v for v in vals)
    return out


# Executor shipping: deletion-vector decode runs INSIDE mapInPandas
# closures, and executor Python workers cannot import spype_spark when
# the caller put it on sys.path at runtime (how the external harness
# runs). Registering the module for by-value pickling makes cloudpickle
# ship this stdlib-only code with the closure — the same convention as
# codecs.py.
def _register_for_executor_shipping() -> None:
    from pyspark import cloudpickle

    cloudpickle.register_pickle_by_value(sys.modules[__name__])


_register_for_executor_shipping()
