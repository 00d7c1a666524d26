"""Per-file Bloom filters for high-cardinality merge/lookup keys.

Min/max file statistics (the manifest's default prune material) have a
blind spot this module exists for: HASH-SHAPED keys. A content hash,
uuid, or salted id distributes uniformly, so EVERY data file's
``[min, max]`` on that column spans essentially the whole keyspace and
range refutation never excludes anything — a point DELETE or a small
CDC upsert against a 100 TB table keyed by ``doc_sha`` rewrites (or at
least scans) every file. Delta Lake answers this with Bloom filter
indexes and Parquet with column-level Bloom filters (neither readable
from this environment's pyarrow); this module re-expresses the idea at
the MANIFEST layer, where this engine already keeps its pruning
metadata: each data file entry of an opted-in table carries a small
Bloom filter over its values of the declared key columns, and the
planners consult it exactly like min/max stats — a membership MISS is
a proof of absence (Bloom filters have no false negatives), so the
file can be carried/skipped; a HIT means "maybe", never "yes".

Shape and discipline:

- Deterministic double hashing (Kirsch–Mitzenmacher over the two
  64-bit halves of ``md5(canonical value)``): the same value set
  always builds the same filter, so filters survive manifest
  round-trips byte-identically and tests can pin them.
- Sized for ~1% false positives (10 bits/distinct value, k=7) and
  CAPPED at ``BLOOM_MAX_BITS`` — an over-full filter degrades toward
  "always maybe", which is merely useless, never wrong. The cap keeps
  the largest per-file/per-key entry ~16 KiB of bitset (~22 KiB
  base64) so manifests stay metadata-sized.
- NULLs never enter a filter and never consult one: equality can't
  match NULL, and the planners' null-count rule already covers
  IS NULL predicates.
- Only string and integral keys are accepted (the same "key material"
  rule as :func:`manifest_log.usable_stat_pair` — float equality is
  not a join discipline, bytes/bool are payloads). Canonical form is
  ``str(value)`` with integral values normalized through ``int`` so a
  numpy int64 read back by pyarrow probes equal to the Python int a
  planner collects from Spark.
"""

from __future__ import annotations

import base64
import hashlib

__all__ = [
    "BLOOM_MAX_BITS",
    "BLOOM_INLINE_MAX_BITS",
    "bloom_build",
    "bloom_might_contain",
    "bloom_all_miss",
]

# 2^24 bits = 2 MiB bitset per (file, key): at 10 bits/value the
# nominal ~1% fpp holds through ~1.6M distinct values per file — the
# row count a real ~100 MB–1 GB data file actually carries; beyond
# that the filter saturates toward fpp 1 (useless-but-sound). Filters
# this size do NOT ride the manifest JSON: past
# BLOOM_INLINE_MAX_BITS the lakehouse stores the bitset as a SIDECAR
# file next to its data file (Delta's Bloom index / Parquet's column
# Bloom are sidecar/footer bytes for the same reason) and the entry
# keeps only {m, k, t, ref}.
BLOOM_MAX_BITS = 1 << 24
# Inline (base64-in-manifest) ceiling: 2 KiB of bitset ≈ 2.7 KiB of
# JSON — small tables stay one readable object, big files go sidecar.
BLOOM_INLINE_MAX_BITS = 1 << 14
_BITS_PER_VALUE = 10
_K = 7


def _hash_pair(value) -> tuple[int, int]:
    """The two 64-bit double-hashing bases for one value. Canonical
    form unifies numpy/python integral spellings; strings hash as
    their UTF-8 bytes."""
    if isinstance(value, bool):
        raise TypeError("bool is not Bloom key material")
    if isinstance(value, str):
        raw = value.encode("utf-8")
    else:
        raw = str(int(value)).encode("ascii")
    d = hashlib.md5(raw).digest()
    return int.from_bytes(d[:8], "big"), int.from_bytes(d[8:], "big")


def _indices(value, m: int):
    h1, h2 = _hash_pair(value)
    # h2 forced odd: guarantees a full-period probe sequence for
    # power-of-two m (the standard double-hashing hygiene)
    h2 |= 1
    for i in range(_K):
        yield (h1 + i * h2) % m


def _size_bits(n_distinct: int) -> int:
    m = max(64, n_distinct * _BITS_PER_VALUE)
    # round up to a power of two (cheap modulo distribution, stable
    # sizes), then cap
    p = 64
    while p < m:
        p <<= 1
    return min(p, BLOOM_MAX_BITS)


def _type_class(v) -> str | None:
    """"s" for strings, "i" for integral ints, None for anything else
    (not Bloom key material)."""
    if isinstance(v, str):
        return "s"
    if isinstance(v, int) and not isinstance(v, bool):
        return "i"
    return None


def bloom_build(values) -> dict | None:
    """Build one filter over an iterable of values (NULLs skipped).
    Returns the manifest-JSON form ``{"m": bits, "k": hashes,
    "t": type class, "b": base64(bitset)}`` — or None for an empty
    value set (an all-NULL or zero-row file needs no filter; the
    planners treat a missing filter as "maybe", and the null-count
    rule already prunes the all-NULL case for equality probes).

    ``t`` records the column's value-type class ("s" string /
    "i" integral): probes of the OTHER class return no verdict, never
    a refutation — Spark's implicit casts make cross-type equality
    true on spellings a canonical-string filter can't see (``'05' =
    5`` holds after the cast, but a filter built from ``'05'`` would
    miss a probe of ``5`` → unsound prune). The min/max stats path
    refuses cross-type compares identically (TypeError → keep)."""
    vals = {v for v in values if v is not None}
    if not vals:
        return None
    tcs = {_type_class(v) for v in vals}
    if len(tcs) != 1 or None in tcs:
        raise TypeError(
            f"Bloom key values must be all-string or all-integral, "
            f"got classes {sorted(str(t) for t in tcs)}"
        )
    m = _size_bits(len(vals))
    # Vectorized build (r15 opt), byte-identical to the per-value loop:
    # md5 per distinct value (the only per-value Python step), then the
    # 7 probe indices and the bit sets in numpy. uint64 wraparound is
    # harmless — m is a power of two, so (x mod 2^64) mod m == x mod m.
    import numpy as np
    tc = tcs.pop()
    if tc == "s":
        digs = [hashlib.md5(v.encode("utf-8")).digest() for v in vals]
    else:
        digs = [
            hashlib.md5(str(int(v)).encode("ascii")).digest()
            for v in vals
        ]
    arr = np.frombuffer(b"".join(digs), dtype=">u8").reshape(-1, 2)
    h1 = np.ascontiguousarray(arr[:, 0])
    h2 = np.ascontiguousarray(arr[:, 1]) | np.uint64(1)
    ks = np.arange(_K, dtype=np.uint64)
    idx = (h1[:, None] + ks[None, :] * h2[:, None]) % np.uint64(m)
    bits = np.zeros(m // 8, dtype=np.uint8)
    np.bitwise_or.at(
        bits,
        (idx >> np.uint64(3)).ravel().astype(np.int64),
        (np.uint8(1) << (idx & np.uint64(7)).astype(np.uint8)).ravel(),
    )
    return {
        "m": m,
        "k": _K,
        "t": tc,
        "b": base64.b64encode(bits.tobytes()).decode("ascii"),
    }


def bloom_might_contain(bf: dict, value, bits: bytes | None = None) -> bool:
    """Three-valued membership: False is a PROOF the value was never
    inserted; True means "maybe". NULL, non-key-material, and
    cross-type-class probes return True (no verdict) — sound either
    way (see :func:`bloom_build` on the ``t`` field). ``bits`` is the
    resolved bitset for sidecar-backed filters (entries carrying
    ``ref`` instead of inline ``b``); when absent and the filter is
    not inline, there is no verdict."""
    if value is None or _type_class(value) != bf.get("t"):
        return True
    if bits is None:
        if "b" not in bf:
            return True  # sidecar-backed and unresolved: no verdict
        bits = base64.b64decode(bf["b"])
    try:
        idxs = list(_indices(value, int(bf["m"])))
    except (TypeError, ValueError):
        return True
    return all(bits[i >> 3] & (1 << (i & 7)) for i in idxs)


def bloom_all_miss(bf: dict, values, bits: bytes | None = None) -> bool:
    """True when EVERY non-null value provably misses ``bf`` — the
    file-refutation form the merge planner uses (no update key lives
    in the file ⇒ the file holds no matched row). An empty non-null
    value set returns False (no verdict from no evidence — the
    caller's range/partition rules decide). Any probe the filter has
    no verdict for (NULL excepted — equality can't match NULL) makes
    the whole pass inconclusive: False. ``bits`` resolves
    sidecar-backed filters, as in :func:`bloom_might_contain`."""
    seen = False
    for v in values:
        if v is None:
            continue
        if _type_class(v) != bf.get("t"):
            return False  # cross-type probe: no verdict possible
        try:
            idxs = list(_indices(v, int(bf["m"])))
        except (TypeError, ValueError):
            return False
        if bits is None:
            if "b" not in bf:
                return False  # sidecar unresolved: no verdict
            bits = base64.b64decode(bf["b"])
        seen = True
        if all(bits[i >> 3] & (1 << (i & 7)) for i in idxs):
            return False  # one possible hit: the file may hold a match
    return seen


# Ship this module's code inside pickled closures — the Python
# DataSource workers (lake_sink) cannot import spype_spark (the
# manifest_log/arrow_shape convention).
try:  # pragma: no cover
    import sys as _sys

    from pyspark import cloudpickle as _cp

    _cp.register_pickle_by_value(_sys.modules[__name__])
except Exception:  # pragma: no cover
    pass
