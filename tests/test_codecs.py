"""Byte-exact tests for the real dependency-free codecs
(spype_spark.codecs): hand-assembled fixtures decoded field-for-field,
encode→decode round-trips, malformed-input rejection, and the
REAL_DECODERS registration the multimodal contracts rely on."""

import struct

import pytest

from spype_spark.codecs import decode_bmp, decode_wav, encode_bmp, encode_wav


def _hand_built_bmp_2x2() -> tuple[bytes, bytes]:
    """A 2x2 24-bpp BMP assembled byte-by-byte from the spec (not via
    encode_bmp, so the decoder is tested against the FORMAT, not the
    sibling encoder). Pixels top-down BGR: (1,2,3) (4,5,6) / (7,8,9)
    (10,11,12); stored bottom-up, 6-byte rows padded to 8."""
    row_bottom = bytes([7, 8, 9, 10, 11, 12]) + b"\x00\x00"
    row_top = bytes([1, 2, 3, 4, 5, 6]) + b"\x00\x00"
    body = row_bottom + row_top  # bottom-up storage
    header = struct.pack("<2sIHHI", b"BM", 54 + len(body), 0, 0, 54)
    info = struct.pack(
        "<IiiHHIIiiII", 40, 2, 2, 1, 24, 0, len(body), 2835, 2835, 0, 0
    )
    expect_top_down = bytes(range(1, 13))
    return header + info + body, expect_top_down


def test_decode_bmp_hand_built_fixture():
    payload, expect = _hand_built_bmp_2x2()
    img = decode_bmp(payload)
    assert (img["width"], img["height"]) == (2, 2)
    assert img["pixels"] == expect  # padding stripped, rows reordered


def test_decode_bmp_top_down_negative_height():
    """Negative biHeight = rows already top-down; decoder must NOT
    flip them."""
    payload, expect = _hand_built_bmp_2x2()
    # rewrite height to -2 and swap the stored rows to top-down order
    info = bytearray(payload[14:54])
    struct.pack_into("<i", info, 8, -2)
    body = payload[54:62], payload[62:70]
    rebuilt = payload[:14] + bytes(info) + body[1] + body[0]
    img = decode_bmp(rebuilt)
    assert img["pixels"] == expect


def test_bmp_round_trip_exact():
    px = bytes((i * 37 + 11) % 256 for i in range(5 * 3 * 3))  # 5x3
    img = decode_bmp(encode_bmp(px, 5, 3))
    assert (img["width"], img["height"]) == (5, 3)
    assert img["pixels"] == px


@pytest.mark.parametrize(
    "mutate",
    [
        lambda b: b"XX" + b[2:],                      # bad magic
        lambda b: b[:30],                             # truncated header
        lambda b: b[:-4],                             # truncated pixels
        lambda b: b[:28] + b"\x08\x00" + b[30:],      # 8-bpp
        lambda b: b[:30] + b"\x01\x00\x00\x00" + b[34:],  # RLE compression
        # pixel offset 0 would alias header bytes as pixel rows
        lambda b: b[:10] + b"\x00\x00\x00\x00" + b[14:],
        # offset inside the info header (same aliasing, subtler)
        lambda b: b[:10] + struct.pack("<I", 20) + b[14:],
        # offset past EOF
        lambda b: b[:10] + struct.pack("<I", len(b) + 1) + b[14:],
    ],
)
def test_decode_bmp_rejects_malformed(mutate):
    payload, _ = _hand_built_bmp_2x2()
    with pytest.raises(ValueError):
        decode_bmp(mutate(payload))


def _hand_built_wav() -> tuple[bytes, list[int]]:
    """16-bit mono PCM, 4 frames, with a LIST chunk between fmt and
    data (real encoders emit ancillary chunks; the parser must walk,
    not assume adjacency)."""
    samples = [0, 1000, -1000, 32767]
    data = b"".join(struct.pack("<h", s) for s in samples)
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    listc = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"  # odd+pad
    chunks = (
        b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + listc
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks, (
        samples
    )


def test_decode_wav_hand_built_fixture():
    payload, samples = _hand_built_wav()
    w = decode_wav(payload)
    assert w["sample_rate"] == 8000
    assert w["n_channels"] == 1
    assert w["bits"] == 16
    assert w["n_frames"] == 4
    assert w["samples"] == samples


def test_wav_round_trip_stereo_channel0():
    frames = [(i * 513 - 4000, -i * 257) for i in range(10)]
    raw = b"".join(struct.pack("<hh", a, b) for a, b in frames)
    w = decode_wav(encode_wav(raw, sample_rate=44100, n_channels=2))
    assert w["n_frames"] == 10 and w["n_channels"] == 2
    assert w["samples"] == [a for a, _ in frames]


def test_encode_wav_odd_data_chunk_is_riff_canonical():
    """8-bit mono with an odd frame count: the data chunk is odd-sized,
    so a canonical encoder appends a pad byte (excluded from the chunk
    size, included in the RIFF size). A strict parser checks both."""
    raw = bytes([128, 200, 55])  # 3 frames of 8-bit mono = odd chunk
    payload = encode_wav(raw, sample_rate=8000, n_channels=1, bits=8)
    # total file length is even: 12-byte RIFF/WAVE preamble + chunks
    assert len(payload) % 2 == 0
    (riff_size,) = struct.unpack_from("<I", payload, 4)
    assert riff_size == len(payload) - 8  # pad byte counted in RIFF size
    data_at = payload.index(b"data")
    (data_size,) = struct.unpack_from("<I", payload, data_at + 4)
    assert data_size == 3  # pad byte NOT counted in the chunk size
    assert payload[-1] == 0  # the pad byte itself
    w = decode_wav(payload)
    assert w["samples"] == [128, 200, 55]


def test_decode_wav_rejects_malformed():
    payload, _ = _hand_built_wav()
    with pytest.raises(ValueError):
        decode_wav(b"RIFX" + payload[4:])
    with pytest.raises(ValueError):
        decode_wav(payload[:40])  # fmt present, data truncated away
    # float PCM (format 3) is out of profile
    bad = bytearray(payload)
    bad[20] = 3
    with pytest.raises(ValueError):
        decode_wav(bytes(bad))


def test_real_decoders_registered():
    from spype_spark.queries.multimodal import REAL_DECODERS, _decode_real

    assert REAL_DECODERS["image/bmp"] is decode_bmp
    assert REAL_DECODERS["audio/wav"] is decode_wav
    payload, expect = _hand_built_bmp_2x2()
    assert _decode_real("image/bmp", payload)["pixels"] == expect
    # the remaining codec seam: video containers (JPEG graduated to a
    # real decoder in round 13, PNG in round 12)
    with pytest.raises(NotImplementedError):
        _decode_real("video/mp4", b"\x00\x00\x00\x18ftypmp42")


# ---------------------------------------------------------------------------
# PNG
# ---------------------------------------------------------------------------

from spype_spark.codecs import decode_png, encode_png  # noqa: E402


def _gradient_pixels(width: int, height: int, channels: int) -> bytes:
    return bytes(
        (x * 7 + y * 13 + c * 31) % 256
        for y in range(height)
        for x in range(width)
        for c in range(channels)
    )


@pytest.mark.parametrize("channels", [3, 4])
@pytest.mark.parametrize("filters", ["none", 1, 2, 3, 4, "cycle"])
def test_png_round_trip_all_filters(channels, filters):
    """Every scanline filter (and the cycle fixture mode) round-trips
    byte-exactly for RGB and RGBA."""
    px = _gradient_pixels(5, 7, channels)
    img = decode_png(encode_png(px, 5, 7, channels=channels, filters=filters))
    assert (img["width"], img["height"], img["channels"]) == (5, 7, channels)
    assert img["pixels"] == px


def test_png_hand_built_with_ancillary_and_split_idat():
    """A parser-shaped file: ancillary tEXt chunk between IHDR and the
    IDATs, and the deflate stream SPLIT across two IDAT chunks — both
    legal per spec and emitted by real encoders."""
    import struct as _s
    import zlib as _z

    from spype_spark.codecs import _png_chunk

    px = _gradient_pixels(4, 3, 3)
    raw = b"".join(
        b"\x00" + px[y * 12 : (y + 1) * 12] for y in range(3)
    )
    z = _z.compress(raw, 6)
    ihdr = _s.pack(">IIBBBBB", 4, 3, 8, 2, 0, 0, 0)
    payload = (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"tEXt", b"Comment\x00hand built")
        + _png_chunk(b"IDAT", z[: len(z) // 2])
        + _png_chunk(b"IDAT", z[len(z) // 2 :])
        + _png_chunk(b"IEND", b"")
    )
    img = decode_png(payload)
    assert img["pixels"] == px and img["width"] == 4 and img["height"] == 3


def test_png_rejects_malformed():
    px = _gradient_pixels(4, 4, 3)
    good = encode_png(px, 4, 4, filters="cycle")
    # bad signature
    with pytest.raises(ValueError):
        decode_png(b"\x88" + good[1:])
    # CRC flip in IHDR
    bad = bytearray(good)
    bad[29] ^= 0xFF  # inside IHDR's CRC field
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(bad))
    # 16-bit depth out of profile
    bad = bytearray(good)
    bad[24] = 16
    import struct as _s
    import zlib as _z
    bad[29:33] = _s.pack(">I", _z.crc32(b"IHDR" + bytes(bad[16:29])) & 0xFFFFFFFF)
    with pytest.raises(ValueError, match="8-bit"):
        decode_png(bytes(bad))
    # grayscale (color type 0) out of profile
    bad = bytearray(good)
    bad[25] = 0
    bad[29:33] = _s.pack(">I", _z.crc32(b"IHDR" + bytes(bad[16:29])) & 0xFFFFFFFF)
    with pytest.raises(ValueError, match="RGB"):
        decode_png(bytes(bad))
    # truncated: IEND missing
    with pytest.raises(ValueError, match="IHDR/IEND"):
        decode_png(good[:-12])
    # corrupt deflate stream inside a CRC-valid IDAT
    from spype_spark.codecs import _png_chunk
    sig_ihdr = good[: 8 + 25]
    with pytest.raises(ValueError, match="IDAT|scanline"):
        decode_png(sig_ihdr + _png_chunk(b"IDAT", b"junk") + _png_chunk(b"IEND", b""))
    # scanline byte count mismatch (valid zlib, wrong length)
    short = _z.compress(b"\x00" + bytes(11), 6)  # one 4px RGB row missing a byte
    with pytest.raises(ValueError, match="scanline"):
        decode_png(sig_ihdr + _png_chunk(b"IDAT", short) + _png_chunk(b"IEND", b""))


def test_png_registered_in_real_decoders():
    from spype_spark.queries.multimodal import REAL_DECODERS, _decode_real

    assert REAL_DECODERS["image/png"] is decode_png
    px = _gradient_pixels(2, 2, 3)
    assert _decode_real("image/png", encode_png(px, 2, 2))["pixels"] == px


# ---------------------------------------------------------------------------
# JPEG (baseline sequential, round 13)
# ---------------------------------------------------------------------------

from spype_spark.codecs import decode_jpeg, encode_jpeg  # noqa: E402


def _const_block_grey(block_vals, blocks_w, blocks_h):
    w, h = blocks_w * 8, blocks_h * 8
    px = bytearray(w * h)
    for bi in range(blocks_h):
        for bj in range(blocks_w):
            v = block_vals[bi * blocks_w + bj]
            for r in range(8):
                for c in range(8):
                    px[(bi * 8 + r) * w + bj * 8 + c] = v
    return bytes(px), w, h


def test_jpeg_constant_blocks_round_trip_exact():
    """Quality 100 gives all-ones quantization tables, and an 8×8
    block of one value is DC-only — the whole huffman/marker/DCT
    chain must round-trip BIT-EXACTLY (the contract's oracle leans on
    this)."""
    px, w, h = _const_block_grey([0, 255, 128, 7, 200, 64, 33, 91, 130], 3, 3)
    img = decode_jpeg(encode_jpeg(px, w, h, channels=1, quality=100))
    assert (img["width"], img["height"], img["channels"]) == (w, h, 1)
    assert img["pixels"] == px


def test_jpeg_gradient_bounded_error():
    px = bytes((x * 3 + y * 5) % 256 for y in range(40) for x in range(32))
    img = decode_jpeg(encode_jpeg(px, 32, 40, channels=1, quality=90))
    assert img["width"] == 32 and img["height"] == 40
    err = max(abs(a - b) for a, b in zip(px, img["pixels"]))
    assert err <= 32, f"q90 max error {err}"


def test_jpeg_rgb_444_and_420():
    # smooth ramp: both subsamplings must reconstruct within a loose
    # bound (420 averages chroma 2x2)
    w, h = 24, 16
    rgb = bytes(
        v
        for y in range(h)
        for x in range(w)
        for v in ((x * 10) % 256, (y * 14) % 256, ((x + y) * 6) % 256)
    )
    for sub, tol in (("444", 24), ("420", 48)):
        img = decode_jpeg(
            encode_jpeg(rgb, w, h, channels=3, quality=95, subsampling=sub)
        )
        assert (img["width"], img["height"], img["channels"]) == (w, h, 3)
        err = max(abs(a - b) for a, b in zip(rgb, img["pixels"]))
        assert err <= tol, f"{sub} max error {err}"


def test_jpeg_restart_markers():
    px, w, h = _const_block_grey(list(range(0, 240, 10)), 6, 4)
    data = encode_jpeg(px, w, h, channels=1, quality=100, restart_interval=3)
    assert b"\xff\xdd" in data  # DRI segment present
    assert any(bytes([0xFF, 0xD0 + i]) in data for i in range(8))
    img = decode_jpeg(data)
    assert img["pixels"] == px
    # a dropped restart marker is a loud error, not silent corruption
    i = data.find(b"\xff\xd0")
    if i < 0:
        i = next(
            data.find(bytes([0xFF, 0xD0 + k]))
            for k in range(8)
            if data.find(bytes([0xFF, 0xD0 + k])) >= 0
        )
    with pytest.raises(ValueError):
        decode_jpeg(data[:i] + data[i + 2 :])


def test_jpeg_odd_dimensions_mcu_padding():
    px = bytes((x + y) % 256 for y in range(13) for x in range(11))
    img = decode_jpeg(encode_jpeg(px, 11, 13, channels=1, quality=85))
    assert (img["width"], img["height"]) == (11, 13)
    assert len(img["pixels"]) == 11 * 13


def test_jpeg_out_of_profile_is_loud():
    px, w, h = _const_block_grey([50], 1, 1)
    data = bytearray(encode_jpeg(px, w, h, channels=1, quality=100))
    # flip SOF0 -> SOF2 (progressive): must refuse, not mis-decode
    i = data.find(b"\xff\xc0")
    assert i >= 0
    data[i + 1] = 0xC2
    with pytest.raises(ValueError, match="progressive"):
        decode_jpeg(bytes(data))
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"\x89PNG\r\n")
    with pytest.raises(ValueError):
        decode_jpeg(encode_jpeg(px, w, h, quality=100)[:40])  # truncated


def test_jpeg_registered_in_real_decoders():
    from spype_spark.queries.multimodal import REAL_DECODERS, _decode_real

    assert REAL_DECODERS["image/jpeg"] is decode_jpeg
    px, w, h = _const_block_grey([9, 99, 199, 249], 2, 2)
    got = _decode_real("image/jpeg", encode_jpeg(px, w, h, quality=100))
    assert got["pixels"] == px
