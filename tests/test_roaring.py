"""Roaring bitmap codec (spype_spark/roaring.py): the portable 32-bit
format (RoaringFormatSpec) and the 64-bit RoaringBitmapArray layout
Delta deletion vectors store. Round-trip properties + a hand-built
run-container payload (the container kind the encoder never emits but
a conforming decoder must read)."""

import random
import struct

import pytest

from spype_spark import roaring as R


@pytest.mark.parametrize("seed", range(8))
def test_bitmap32_round_trip_random(seed):
    rng = random.Random(seed)
    kind = seed % 4
    if kind == 0:
        vals = rng.sample(range(1 << 16), rng.randint(0, 300))
    elif kind == 1:  # dense container -> bitmap encoding
        vals = rng.sample(range(1 << 16), 5000) + [70000, 70001]
    elif kind == 2:  # many high-16 keys
        vals = [rng.randrange(1 << 32) for _ in range(500)]
    else:
        vals = []
    got = R.deserialize_bitmap32(R.serialize_bitmap32(vals))
    assert got == sorted(set(vals))


@pytest.mark.parametrize("seed", range(6))
def test_array64_round_trip_random(seed):
    rng = random.Random(100 + seed)
    vals = [rng.randrange(1 << 40) for _ in range(seed * 100)]
    got = R.deserialize_array64(R.serialize_array64(vals))
    assert got == sorted(set(vals))


def test_run_container_decode():
    """Cookie 12347 with a run container: 100..199 and 500..501 under
    high key 2; < 4 containers -> no offset header."""
    body = struct.pack("<i", (1 - 1) << 16 | 12347)
    body += bytes([0b1])  # run flag for container 0
    body += struct.pack("<HH", 2, 102 - 1)
    body += struct.pack("<H", 2)
    body += struct.pack("<HH", 100, 99)
    body += struct.pack("<HH", 500, 1)
    got = R.deserialize_bitmap32(body)
    assert got == [(2 << 16) | v for v in list(range(100, 200)) + [500, 501]]


def test_malformed_is_loud():
    with pytest.raises(ValueError, match="cookie"):
        R.deserialize_bitmap32(struct.pack("<i", 999))
    with pytest.raises(ValueError, match="magic"):
        R.deserialize_array64(struct.pack("<iq", 42, 0))
    with pytest.raises(ValueError, match="truncated"):
        R.deserialize_array64(b"\x00")
    with pytest.raises(ValueError, match="2\\^32"):
        R.serialize_bitmap32([1 << 33])


def test_bitmap_container_boundary():
    """Exactly 4097 values in one 16-bit bucket forces the bitmap
    container encoding; 4096 stays an array container."""
    a = list(range(4096))
    b = list(range(4097))
    assert R.deserialize_bitmap32(R.serialize_bitmap32(a)) == a
    assert R.deserialize_bitmap32(R.serialize_bitmap32(b)) == b
    # a sparse second bucket proves mixed container kinds round-trip
    c = b + [(5 << 16) + 7]
    assert R.deserialize_bitmap32(R.serialize_bitmap32(c)) == c
