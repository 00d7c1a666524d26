"""Real, dependency-free media codecs for the multimodal column stack.

The container ships no image/audio libraries, but three ubiquitous
formats are simple enough to parse exactly with the standard library:
uncompressed 24-bpp BI_RGB **BMP** (BITMAPFILEHEADER + BITMAPINFOHEADER
+ padded bottom-up pixel rows), **WAV** PCM (RIFF container, fmt
chunk, 8/16-bit samples), and 8-bit RGB/RGBA **PNG** (chunk stream with
CRC validation, zlib IDAT inflate, all five per-row scanline filters —
None/Sub/Up/Average/Paeth). These are REAL decoders — they accept any
conforming file produced by any tool, validate the headers, and raise
:class:`ValueError` on malformed input — registered into
:data:`spype_spark.queries.multimodal.REAL_DECODERS` so the decode
contracts exercise actual codec branches instead of the byte-level
fake. The matching encoders exist to build byte-exact test fixtures
and to wrap corpus bytes into valid media payloads inside contracts.

Everything is pure ``struct``/``zlib`` parsing over ``bytes`` —
executor-side under ``mapInPandas``, no driver involvement, no external
imports — so the 100 TB story is unchanged: Arrow hands the payload
batch to Python, the codec walks it, features come back columnar.
"""

from __future__ import annotations

import struct
import sys
import zlib

# BITMAPFILEHEADER / BITMAPINFOHEADER formats. Plain format strings,
# not precompiled struct.Struct objects: the module ships to executors
# BY VALUE (see _register_for_executor_shipping) and _struct.Struct
# instances are not picklable.
_BMP_HEADER_FMT = "<2sIHHI"
_BMP_HEADER_SIZE = struct.calcsize(_BMP_HEADER_FMT)
_BMP_INFO_FMT = "<IiiHHIIiiII"
_BMP_INFO_SIZE = struct.calcsize(_BMP_INFO_FMT)


def encode_bmp(pixels: bytes, width: int, height: int) -> bytes:
    """Build an uncompressed 24-bpp BI_RGB BMP from raw BGR bytes
    (``pixels`` is ``height`` rows TOP-DOWN of ``width*3`` bytes; the
    encoder stores them bottom-up with 4-byte row padding, as the
    format requires)."""
    row = width * 3
    if len(pixels) != row * height:
        raise ValueError(
            f"pixel buffer is {len(pixels)} bytes, expected {row * height}"
        )
    pad = (-row) % 4
    body = b"".join(
        pixels[r * row : (r + 1) * row] + b"\x00" * pad
        for r in range(height - 1, -1, -1)
    )
    offset = _BMP_HEADER_SIZE + _BMP_INFO_SIZE
    header = struct.pack(_BMP_HEADER_FMT, b"BM", offset + len(body), 0, 0, offset)
    info = struct.pack(
        _BMP_INFO_FMT,
        _BMP_INFO_SIZE, width, height, 1, 24, 0, len(body), 2835, 2835, 0, 0,
    )
    return header + info + body


def decode_bmp(payload: bytes) -> dict:
    """Decode an uncompressed 24-bpp BI_RGB BMP.

    Returns ``{"width", "height", "pixels"}`` with ``pixels`` the raw
    BGR bytes in TOP-DOWN row order, row padding stripped — regardless
    of whether the file stored its rows bottom-up (positive height, the
    common case) or top-down (negative height). Raises ValueError on
    anything that is not this exact profile (wrong magic, compressed,
    other bit depths, truncated pixel data)."""
    if len(payload) < _BMP_HEADER_SIZE + _BMP_INFO_SIZE:
        raise ValueError("truncated BMP header")
    magic, _fsize, _r1, _r2, offset = struct.unpack_from(
        _BMP_HEADER_FMT, payload, 0
    )
    if magic != b"BM":
        raise ValueError(f"not a BMP (magic {magic!r})")
    (
        info_size,
        width,
        height,
        planes,
        bpp,
        compression,
        _img_size,
        _xppm,
        _yppm,
        _ncolors,
        _nimportant,
    ) = struct.unpack_from(_BMP_INFO_FMT, payload, _BMP_HEADER_SIZE)
    if info_size < _BMP_INFO_SIZE or planes != 1:
        raise ValueError("unsupported BMP info header")
    # The pixel-data offset must lie past the headers and inside the
    # file — a malformed offset (e.g. 0) would otherwise silently
    # decode header bytes as pixel rows instead of raising.
    if offset < _BMP_HEADER_SIZE + info_size or offset > len(payload):
        raise ValueError(f"bad pixel-data offset {offset}")
    if bpp != 24 or compression != 0:
        raise ValueError(
            f"only uncompressed 24-bpp BI_RGB supported (bpp={bpp}, "
            f"compression={compression})"
        )
    top_down = height < 0
    height = abs(height)
    if width <= 0 or height <= 0:
        raise ValueError(f"bad dimensions {width}x{height}")
    row = width * 3
    stride = row + ((-row) % 4)
    if len(payload) < offset + stride * height:
        raise ValueError("truncated BMP pixel data")
    rows = [
        payload[offset + r * stride : offset + r * stride + row]
        for r in range(height)
    ]
    if not top_down:
        rows.reverse()
    return {"width": width, "height": height, "pixels": b"".join(rows)}


def encode_wav(
    samples: bytes, sample_rate: int = 8000, n_channels: int = 1,
    bits: int = 16,
) -> bytes:
    """Build a canonical RIFF/WAVE PCM file around raw little-endian
    sample bytes."""
    if bits not in (8, 16):
        raise ValueError("only 8/16-bit PCM")
    block = n_channels * bits // 8
    if len(samples) % block:
        raise ValueError("sample buffer not a whole number of frames")
    fmt = struct.pack(
        "<HHIIHH", 1, n_channels, sample_rate,
        sample_rate * block, block, bits,
    )
    data = samples
    # RIFF chunks are word-aligned: an odd-sized data chunk (possible
    # with 8-bit mono PCM) carries a pad byte that is excluded from the
    # chunk size but included in the RIFF size.
    pad = b"\x00" if len(data) % 2 else b""
    return (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data) + len(pad))
        + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data + pad
    )


def decode_wav(payload: bytes) -> dict:
    """Decode a RIFF/WAVE PCM file (8- or 16-bit, any channel count),
    walking the chunk list like a real parser (fmt may be preceded or
    followed by ancillary chunks; odd-sized chunks are word-padded).

    Returns ``{"sample_rate", "n_channels", "bits", "n_frames",
    "samples"}`` — ``samples`` a list of per-frame integer sample
    values for channel 0 (16-bit signed / 8-bit unsigned, as PCM
    defines them). Raises ValueError on non-PCM or malformed files."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8 : pos + 8 + size]
        if len(body) < size:
            raise ValueError(f"truncated {cid!r} chunk")
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + size + (size % 2)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    if len(fmt) < 16:
        raise ValueError("short fmt chunk")
    audio_format, n_channels, sample_rate, _brate, block, bits = (
        struct.unpack_from("<HHIIHH", fmt, 0)
    )
    if audio_format != 1 or bits not in (8, 16):
        raise ValueError(
            f"only integer PCM supported (format={audio_format}, bits={bits})"
        )
    if block != n_channels * bits // 8 or block == 0:
        raise ValueError("inconsistent block alignment")
    n_frames = len(data) // block
    # bulk frame extraction (r15 opt): array.frombytes + slice runs at
    # C speed and stays stdlib-only; identical values to the old
    # per-sample struct.unpack_from loop (byteswap guards the
    # little-endian wire format on big-endian hosts)
    if bits == 16:
        import array as _array

        a = _array.array("h")
        a.frombytes(data[: n_frames * block])
        if sys.byteorder == "big":
            a.byteswap()
        step = block // 2
        samples = list(a[0::step] if step > 1 else a)
    else:
        samples = list(data[: n_frames * block : block])
    return {
        "sample_rate": sample_rate,
        "n_channels": n_channels,
        "bits": bits,
        "n_frames": n_frames,
        "samples": samples,
    }


# ---------------------------------------------------------------------------
# PNG — 8-bit-depth truecolor (RGB, color type 2) and truecolor+alpha
# (RGBA, color type 6), non-interlaced. The whole format is stdlib:
# chunk framing is struct, CRCs are zlib.crc32, IDAT is zlib deflate,
# and the five scanline filters are byte arithmetic (PNG spec §6, §9).
# ---------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def _paeth(a: int, b: int, c: int) -> int:
    """The Paeth predictor (PNG spec §9.4): pick whichever of left /
    up / up-left is closest to the linear estimate a + b − c."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _filter_row(f: int, line: bytes, prev: bytes, bpp: int) -> bytes:
    """Apply scanline filter ``f`` to a raw row (encoder side)."""
    n = len(line)
    if f == 0:
        return line
    out = bytearray(n)
    if f == 1:  # Sub
        for i in range(n):
            a = line[i - bpp] if i >= bpp else 0
            out[i] = (line[i] - a) & 0xFF
    elif f == 2:  # Up
        for i in range(n):
            out[i] = (line[i] - prev[i]) & 0xFF
    elif f == 3:  # Average
        for i in range(n):
            a = line[i - bpp] if i >= bpp else 0
            out[i] = (line[i] - ((a + prev[i]) >> 1)) & 0xFF
    elif f == 4:  # Paeth
        for i in range(n):
            a = line[i - bpp] if i >= bpp else 0
            c = prev[i - bpp] if i >= bpp else 0
            out[i] = (line[i] - _paeth(a, prev[i], c)) & 0xFF
    else:
        raise ValueError(f"unknown PNG filter {f}")
    return bytes(out)


def _unfilter_row(f: int, line: bytearray, prev: bytes, bpp: int) -> None:
    """Invert scanline filter ``f`` in place (decoder side)."""
    n = len(line)
    if f == 0:
        return
    if f == 1:  # Sub
        for i in range(bpp, n):
            line[i] = (line[i] + line[i - bpp]) & 0xFF
    elif f == 2:  # Up
        for i in range(n):
            line[i] = (line[i] + prev[i]) & 0xFF
    elif f == 3:  # Average
        for i in range(n):
            a = line[i - bpp] if i >= bpp else 0
            line[i] = (line[i] + ((a + prev[i]) >> 1)) & 0xFF
    elif f == 4:  # Paeth
        for i in range(n):
            a = line[i - bpp] if i >= bpp else 0
            c = prev[i - bpp] if i >= bpp else 0
            line[i] = (line[i] + _paeth(a, prev[i], c)) & 0xFF
    else:
        raise ValueError(f"unknown PNG filter {f}")


def encode_png(
    pixels: bytes,
    width: int,
    height: int,
    channels: int = 3,
    filters: str | int = "none",
) -> bytes:
    """Build an 8-bit RGB (``channels=3``) or RGBA (``channels=4``)
    non-interlaced PNG from raw TOP-DOWN pixel bytes.

    ``filters`` picks the per-row scanline filter: ``"none"`` (all 0),
    an int 0–4 (same filter every row), or ``"cycle"`` (row y gets
    filter y % 5 — the fixture mode that exercises every unfilter path
    in one file)."""
    if channels not in (3, 4):
        raise ValueError("channels must be 3 (RGB) or 4 (RGBA)")
    stride = width * channels
    if len(pixels) != stride * height:
        raise ValueError(
            f"pixel buffer is {len(pixels)} bytes, expected {stride * height}"
        )
    if width <= 0 or height <= 0:
        raise ValueError(f"bad dimensions {width}x{height}")
    raw = bytearray()
    prev = bytes(stride)
    for y in range(height):
        line = pixels[y * stride : (y + 1) * stride]
        if filters == "none":
            f = 0
        elif filters == "cycle":
            f = y % 5
        else:
            f = int(filters)
        raw.append(f)
        raw += _filter_row(f, line, prev, channels)
        prev = line
    ihdr = struct.pack(
        ">IIBBBBB", width, height, 8, 2 if channels == 3 else 6, 0, 0, 0
    )
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _png_chunk(b"IEND", b"")
    )


def decode_png(payload: bytes) -> dict:
    """Decode an 8-bit-depth truecolor PNG (color type 2 RGB or 6
    RGBA, non-interlaced) — a REAL parser: chunk walk with per-chunk
    CRC validation, multi-IDAT concatenation, zlib inflate, and full
    unfiltering of all five scanline filters.

    Returns ``{"width", "height", "channels", "pixels"}`` with
    ``pixels`` the raw TOP-DOWN RGB(A) bytes. Raises ValueError on
    anything outside this profile (other bit depths / palette /
    grayscale / interlaced) or on malformed input (bad signature, CRC
    mismatch, truncated or trailing scanline data, missing chunks)."""
    if len(payload) < len(_PNG_SIG) or payload[: len(_PNG_SIG)] != _PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos = len(_PNG_SIG)
    ihdr = None
    idat = bytearray()
    seen_iend = False
    while pos + 8 <= len(payload):
        (size,) = struct.unpack_from(">I", payload, pos)
        ctype = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + size]
        if len(body) < size or pos + 12 + size > len(payload):
            raise ValueError(f"truncated {ctype!r} chunk")
        (crc,) = struct.unpack_from(">I", payload, pos + 8 + size)
        if crc != zlib.crc32(ctype + body) & 0xFFFFFFFF:
            raise ValueError(f"CRC mismatch in {ctype!r} chunk")
        if ctype == b"IHDR":
            if ihdr is not None:
                raise ValueError("duplicate IHDR")
            ihdr = body
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            seen_iend = True
            break
        # ancillary chunks (tEXt, pHYs, …) pass through, like a real
        # parser: CRC-checked above, content ignored
        pos += 12 + size
    if ihdr is None or not seen_iend:
        raise ValueError("missing IHDR/IEND chunk")
    if len(ihdr) != 13:
        raise ValueError("malformed IHDR")
    width, height, depth, color, comp, filt, interlace = struct.unpack(
        ">IIBBBBB", ihdr
    )
    if depth != 8 or color not in (2, 6):
        raise ValueError(
            f"only 8-bit RGB/RGBA supported (depth={depth}, color={color})"
        )
    if comp != 0 or filt != 0 or interlace != 0:
        raise ValueError("unsupported compression/filter/interlace method")
    if width <= 0 or height <= 0:
        raise ValueError(f"bad dimensions {width}x{height}")
    channels = 3 if color == 2 else 4
    stride = width * channels
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as exc:
        raise ValueError(f"corrupt IDAT stream: {exc}") from exc
    if len(raw) != (stride + 1) * height:
        raise ValueError(
            f"scanline data is {len(raw)} bytes, expected "
            f"{(stride + 1) * height}"
        )
    out = bytearray()
    prev = bytes(stride)
    for y in range(height):
        f = raw[y * (stride + 1)]
        line = bytearray(raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)])
        _unfilter_row(f, line, prev, channels)
        out += line
        prev = bytes(line)
    return {
        "width": width,
        "height": height,
        "channels": channels,
        "pixels": bytes(out),
    }


# ---------------------------------------------------------------------------
# JPEG — baseline sequential DCT (ITU T.81 / JFIF), pure Python.
#
# Profile: 8-bit baseline (SOF0) huffman-coded JPEG — greyscale or
# YCbCr with 4:4:4 / 4:2:2 / 4:2:0 sampling, multiple DQT/DHT
# segments, restart markers (DRI/RSTn), 0xFF00 byte unstuffing. The
# tables below are the public Annex K spec constants (quantization
# K.1/K.2, huffman K.3) — spec conformance, not copied source. Loud
# ValueError on anything outside baseline: progressive (SOF2),
# arithmetic coding, 12-bit precision, unsupported sampling factors.
# ---------------------------------------------------------------------------

import math as _math

#: zigzag index -> natural (row-major) index. Diagonal s is traversed
#: with row ascending when s is odd, descending when even (T.81 fig 5).
_JPEG_ZIGZAG: list[int] = [
    r * 8 + c
    for s in range(15)
    for r, c in (
        [(i, s - i) for i in range(max(0, s - 7), min(7, s) + 1)][:: 1 if s % 2 else -1]
    )
]

#: Annex K.1 / K.2 base quantization tables (natural order).
_JPEG_QL_BASE = [
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
]
_JPEG_QC_BASE = [
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
]

#: Annex K.3 huffman table definitions: (BITS[1..16], HUFFVAL).
_JPEG_DC_L = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_JPEG_DC_C = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_JPEG_AC_L = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
_JPEG_AC_C = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)

#: Separable DCT basis: A[u][x] = 0.5·C(u)·cos((2x+1)uπ/16); FDCT is
#: A·f·Aᵀ, IDCT is Aᵀ·F·A (exact inverse pair up to float rounding).
_JPEG_DCT_A = [
    [
        0.5
        * (0.7071067811865476 if u == 0 else 1.0)
        * _math.cos((2 * x + 1) * u * _math.pi / 16)
        for x in range(8)
    ]
    for u in range(8)
]


def _jpeg_quality_tables(quality: int) -> tuple[list[int], list[int]]:
    """IJG quality scaling of the Annex K base tables (quality 100 →
    all-ones tables: lossless DC for constant blocks)."""
    if not 1 <= quality <= 100:
        raise ValueError(f"quality must be 1..100, got {quality}")
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    out = []
    for base in (_JPEG_QL_BASE, _JPEG_QC_BASE):
        out.append([min(255, max(1, (b * scale + 50) // 100)) for b in base])
    return out[0], out[1]


def _jpeg_huff_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """Canonical huffman codes: symbol -> (code, length)."""
    codes: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


class _JpegBitWriter:
    """MSB-first bit accumulator with 0xFF00 byte stuffing."""

    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, code: int, length: int) -> None:
        self._acc = (self._acc << length) | (code & ((1 << length) - 1))
        self._n += length
        while self._n >= 8:
            self._n -= 8
            b = (self._acc >> self._n) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)
        self._acc &= (1 << self._n) - 1

    def pad(self) -> None:
        """Pad to a byte boundary with 1-bits (T.81 F.1.2.3)."""
        if self._n:
            self.write((1 << (8 - self._n)) - 1, 8 - self._n)


def _jpeg_fdct_quant(block: list[int], qtab: list[int]) -> list[int]:
    """Level-shift, forward DCT, and quantize one 8×8 block (natural
    order in, natural order out)."""
    A = _JPEG_DCT_A
    f = [[block[r * 8 + c] - 128 for c in range(8)] for r in range(8)]
    # tmp[u][y] = Σx A[u][x]·f[x][y]
    tmp = [
        [sum(A[u][x] * f[x][y] for x in range(8)) for y in range(8)]
        for u in range(8)
    ]
    out = [0] * 64
    for u in range(8):
        for v in range(8):
            coef = sum(A[v][y] * tmp[u][y] for y in range(8))
            q = qtab[u * 8 + v]
            # symmetric rounding, the IJG convention
            out[u * 8 + v] = int(coef / q + (0.5 if coef >= 0 else -0.5))
    return out


def _jpeg_idct(coef: list[int], qtab: list[int]) -> list[int]:
    """Dequantize + inverse DCT one 8×8 block; returns clamped 0-255
    samples in natural order."""
    A = _JPEG_DCT_A
    F = [
        [coef[u * 8 + v] * qtab[u * 8 + v] for v in range(8)]
        for u in range(8)
    ]
    # tmp[x][v] = Σu A[u][x]·F[u][v]
    tmp = [
        [sum(A[u][x] * F[u][v] for u in range(8)) for v in range(8)]
        for x in range(8)
    ]
    out = [0] * 64
    for x in range(8):
        row = tmp[x]
        for y in range(8):
            s = sum(A[v][y] * row[v] for v in range(8))
            p = int(s + 128.5) if s >= -128.5 else 0
            out[x * 8 + y] = 0 if p < 0 else (255 if p > 255 else p)
    return out


def _jpeg_mag_bits(v: int) -> tuple[int, int]:
    """(category, appended-bit pattern) for a DC diff / AC value —
    negatives use the one's-complement convention (T.81 F.1.2.1)."""
    if v == 0:
        return 0, 0
    a = abs(v)
    s = a.bit_length()
    return s, (v if v > 0 else v + (1 << s) - 1)


def _jpeg_encode_block(
    w: _JpegBitWriter,
    coefs: list[int],
    pred: int,
    dc_codes: dict,
    ac_codes: dict,
) -> int:
    """Huffman-encode one quantized block (natural order); returns the
    new DC predictor."""
    zz = [coefs[_JPEG_ZIGZAG[i]] for i in range(64)]
    s, bits = _jpeg_mag_bits(zz[0] - pred)
    code, ln = dc_codes[s]
    w.write(code, ln)
    if s:
        w.write(bits, s)
    run = 0
    last_nz = 0
    for i in range(63, 0, -1):
        if zz[i]:
            last_nz = i
            break
    for i in range(1, last_nz + 1):
        if zz[i] == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_codes[0xF0]  # ZRL
            w.write(code, ln)
            run -= 16
        s, bits = _jpeg_mag_bits(zz[i])
        code, ln = ac_codes[(run << 4) | s]
        w.write(code, ln)
        w.write(bits, s)
        run = 0
    if last_nz != 63:
        code, ln = ac_codes[0x00]  # EOB
        w.write(code, ln)
    return zz[0]


def _jpeg_plane_blocks(
    plane: list[int], pw: int, ph: int, bx: int, by: int
) -> list[int]:
    """Extract the 8×8 block at block coords (bx, by) from a plane,
    replicating edge samples past the plane boundary."""
    out = []
    for r in range(8):
        y = min(by * 8 + r, ph - 1)
        row = plane[y * pw : (y + 1) * pw]
        for c in range(8):
            out.append(row[min(bx * 8 + c, pw - 1)])
    return out


def encode_jpeg(
    pixels: bytes,
    width: int,
    height: int,
    channels: int = 1,
    quality: int = 90,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """Build a baseline sequential JFIF JPEG from raw TOP-DOWN pixel
    bytes — greyscale (``channels=1``) or RGB (``channels=3``,
    converted to YCbCr; ``subsampling`` ``"444"``/``"420"``).
    ``quality`` uses the IJG scaling of the Annex K tables (100 → all
    -ones quantization: constant blocks round-trip bit-exactly).
    ``restart_interval`` > 0 emits DRI + RSTn markers every that many
    MCUs."""
    if channels not in (1, 3):
        raise ValueError("channels must be 1 (grey) or 3 (RGB)")
    if subsampling not in ("444", "420"):
        raise ValueError(f"unsupported subsampling {subsampling!r}")
    if width <= 0 or height <= 0:
        raise ValueError(f"bad dimensions {width}x{height}")
    if len(pixels) != width * height * channels:
        raise ValueError(
            f"pixel buffer is {len(pixels)} bytes, expected "
            f"{width * height * channels}"
        )
    ql, qc = _jpeg_quality_tables(quality)
    # --- component planes -------------------------------------------------
    if channels == 1:
        planes = [list(pixels)]
        samp = [(1, 1)]
        qsel = [0]
        qtabs = [ql]
    else:
        n = width * height
        ys = [0] * n
        cb = [0.0] * n
        cr = [0.0] * n
        for i in range(n):
            r, g, b = pixels[3 * i], pixels[3 * i + 1], pixels[3 * i + 2]
            y = 0.299 * r + 0.587 * g + 0.114 * b
            ys[i] = min(255, max(0, int(y + 0.5)))
            cb[i] = 128.0 - 0.168735892 * r - 0.331264108 * g + 0.5 * b
            cr[i] = 128.0 + 0.5 * r - 0.418687589 * g - 0.081312411 * b
        if subsampling == "444":
            planes = [
                ys,
                [min(255, max(0, int(v + 0.5))) for v in cb],
                [min(255, max(0, int(v + 0.5))) for v in cr],
            ]
            samp = [(1, 1), (1, 1), (1, 1)]
        else:  # 420: 2×2 box average
            cw, ch = (width + 1) // 2, (height + 1) // 2
            sub_b = [0] * (cw * ch)
            sub_r = [0] * (cw * ch)
            for yy in range(ch):
                for xx in range(cw):
                    acc_b = acc_r = cnt = 0.0
                    for dy in (0, 1):
                        for dx in (0, 1):
                            sy, sx = yy * 2 + dy, xx * 2 + dx
                            if sy < height and sx < width:
                                acc_b += cb[sy * width + sx]
                                acc_r += cr[sy * width + sx]
                                cnt += 1
                    sub_b[yy * cw + xx] = min(
                        255, max(0, int(acc_b / cnt + 0.5))
                    )
                    sub_r[yy * cw + xx] = min(
                        255, max(0, int(acc_r / cnt + 0.5))
                    )
            planes = [ys, sub_b, sub_r]
            samp = [(2, 2), (1, 1), (1, 1)]
        qsel = [0, 1, 1]
        qtabs = [ql, qc]
    hmax = max(h for h, _ in samp)
    vmax = max(v for _, v in samp)
    mcux = -(-width // (8 * hmax))
    mcuy = -(-height // (8 * vmax))
    pdims = []
    for ci, (h, v) in enumerate(samp):
        if ci == 0:
            pdims.append((width, height))
        else:
            pdims.append((-(-width * h // hmax), -(-height * v // vmax)))
    # --- entropy-coded data -----------------------------------------------
    dc_l = _jpeg_huff_codes(*_JPEG_DC_L)
    ac_l = _jpeg_huff_codes(*_JPEG_AC_L)
    dc_c = _jpeg_huff_codes(*_JPEG_DC_C)
    ac_c = _jpeg_huff_codes(*_JPEG_AC_C)
    w = _JpegBitWriter()
    preds = [0] * len(planes)
    rst = 0
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                w.pad()
                w.out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                preds = [0] * len(planes)
            for ci, (h, v) in enumerate(samp):
                pw, ph = pdims[ci]
                dc = dc_l if ci == 0 else dc_c
                ac = ac_l if ci == 0 else ac_c
                for bv in range(v):
                    for bh in range(h):
                        blk = _jpeg_plane_blocks(
                            planes[ci], pw, ph, mx * h + bh, my * v + bv
                        )
                        q = _jpeg_fdct_quant(blk, qtabs[qsel[ci]])
                        preds[ci] = _jpeg_encode_block(
                            w, q, preds[ci], dc, ac
                        )
            mcu_count += 1
    w.pad()
    # --- marker stream ------------------------------------------------------
    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    zz_ql = bytes(ql[_JPEG_ZIGZAG[i]] for i in range(64))
    out += seg(0xDB, b"\x00" + zz_ql)
    if channels == 3:
        zz_qc = bytes(qc[_JPEG_ZIGZAG[i]] for i in range(64))
        out += seg(0xDB, b"\x01" + zz_qc)
    sof = bytearray(struct.pack(">BHHB", 8, height, width, channels))
    for ci, (h, v) in enumerate(samp):
        sof += bytes([ci + 1, (h << 4) | v, qsel[ci]])
    out += seg(0xC0, bytes(sof))
    for cls, tid, (bits, vals) in (
        (0, 0, _JPEG_DC_L),
        (1, 0, _JPEG_AC_L),
    ) + (((0, 1, _JPEG_DC_C), (1, 1, _JPEG_AC_C)) if channels == 3 else ()):
        out += seg(
            0xC4, bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals)
        )
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytearray([channels])
    for ci in range(channels):
        sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    sos += b"\x00\x3f\x00"
    out += seg(0xDA, bytes(sos))
    out += w.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


class _JpegBitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00
    unstuffing; stops at any non-RST marker."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self._acc = 0
        self._n = 0
        self.marker: int | None = None

    def _fill(self) -> None:
        if self.marker is not None:
            raise ValueError("entropy data ended at a marker mid-symbol")
        if self.pos >= len(self.data):
            raise ValueError("truncated JPEG entropy data")
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            if self.pos >= len(self.data):
                raise ValueError("truncated JPEG entropy data at 0xFF")
            nxt = self.data[self.pos]
            if nxt == 0x00:
                self.pos += 1  # stuffed literal 0xFF
            else:
                # a real marker: signal and yield padding bits
                self.marker = nxt
                self.pos += 1
                raise ValueError(
                    f"unexpected marker 0xFF{nxt:02X} inside entropy data"
                )
        self._acc = (self._acc << 8) | b
        self._n += 8

    def bit(self) -> int:
        if self._n == 0:
            self._fill()
        self._n -= 1
        return (self._acc >> self._n) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def align_restart(self, expect: int) -> None:
        """Byte-align and consume the expected RSTn marker."""
        self._acc = 0
        self._n = 0
        if (
            self.pos + 1 < len(self.data)
            and self.data[self.pos] == 0xFF
            and self.data[self.pos + 1] == 0xD0 + expect
        ):
            self.pos += 2
            return
        raise ValueError(
            f"missing restart marker RST{expect} at offset {self.pos}"
        )


def _jpeg_huff_decoder(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol decode map."""
    table: dict[tuple[int, int], int] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _jpeg_read_symbol(r: _JpegBitReader, table: dict) -> int:
    code, length = 0, 0
    while length < 16:
        code = (code << 1) | r.bit()
        length += 1
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid huffman code in JPEG entropy data")


def _jpeg_extend(v: int, s: int) -> int:
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def decode_jpeg(payload: bytes) -> dict:
    """Decode a baseline sequential huffman JPEG (SOF0) — greyscale or
    YCbCr with 4:4:4 / 4:2:2 / 4:2:0 sampling, restart markers, byte
    unstuffing; a REAL parser that accepts conforming files from any
    encoder in this profile.

    Returns ``{"width", "height", "channels", "pixels"}`` with
    ``pixels`` TOP-DOWN greyscale (1 byte/px) or RGB (3 bytes/px).
    Raises ValueError on malformed input and on out-of-profile files
    (progressive SOF2, arithmetic coding, 12-bit precision,
    hierarchical) — loud, never silently wrong."""
    if len(payload) < 4 or payload[0:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtabs: dict[int, list[int]] = {}
    huff: dict[tuple[int, int], dict] = {}
    frame = None
    restart = 0
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"expected marker at offset {pos}")
        marker = payload[pos + 1]
        if marker == 0xD8:
            pos += 2
            continue
        (seglen,) = struct.unpack_from(">H", payload, pos + 2)
        body = payload[pos + 4 : pos + 2 + seglen]
        if len(body) != seglen - 2:
            raise ValueError(f"truncated segment 0xFF{marker:02X}")
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            o = 0
            while o < len(body):
                pq, tq = body[o] >> 4, body[o] & 0x0F
                if pq != 0:
                    raise ValueError("16-bit quantization tables not baseline")
                zz = list(body[o + 1 : o + 65])
                if len(zz) != 64:
                    raise ValueError("truncated DQT")
                nat = [0] * 64
                for i in range(64):
                    nat[_JPEG_ZIGZAG[i]] = zz[i]
                qtabs[tq] = nat
                o += 65
        elif marker == 0xC4:  # DHT
            o = 0
            while o < len(body):
                cls, tid = body[o] >> 4, body[o] & 0x0F
                bits = list(body[o + 1 : o + 17])
                n = sum(bits)
                vals = list(body[o + 17 : o + 17 + n])
                if len(bits) != 16 or len(vals) != n:
                    raise ValueError("truncated DHT")
                huff[(cls, tid)] = _jpeg_huff_decoder(bits, vals)
                o += 17 + n
        elif marker == 0xC0 or marker == 0xC1:  # baseline / ext. sequential
            prec, h, w_, nc = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise ValueError(f"{prec}-bit precision not baseline")
            if nc not in (1, 3):
                raise ValueError(f"{nc}-component JPEG not supported")
            comps = []
            for i in range(nc):
                cid, hv, tq = body[6 + 3 * i : 9 + 3 * i]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq}
                )
            frame = {"w": w_, "h": h, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            kinds = {0xC2: "progressive", 0xC9: "arithmetic-coded"}
            raise ValueError(
                f"{kinds.get(marker, f'SOF{marker - 0xC0}')} JPEG is "
                f"outside the baseline profile"
            )
        elif marker == 0xDD:  # DRI
            (restart,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = body[0]
            scomps = []
            for i in range(ns):
                cs, tt = body[1 + 2 * i], body[2 + 2 * i]
                scomps.append((cs, tt >> 4, tt & 0x0F))
            return _jpeg_decode_scan(
                payload, pos + 2 + seglen, frame, scomps, qtabs, huff,
                restart,
            )
        elif marker == 0xD9:
            raise ValueError("EOI before any scan")
        # APPn / COM / others: skip
        pos += 2 + seglen
    raise ValueError("no SOS marker found")


def _jpeg_decode_scan(
    payload: bytes,
    pos: int,
    frame: dict,
    scomps: list[tuple[int, int, int]],
    qtabs: dict[int, list[int]],
    huff: dict[tuple[int, int], dict],
    restart: int,
) -> dict:
    comps = frame["comps"]
    width, height = frame["w"], frame["h"]
    if len(scomps) != len(comps):
        raise ValueError("multi-scan JPEG is outside the baseline profile")
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    for c in comps:
        if c["h"] not in (1, 2) or c["v"] not in (1, 2):
            raise ValueError(
                f"sampling factors {c['h']}x{c['v']} not supported"
            )
    mcux = -(-width // (8 * hmax))
    mcuy = -(-height // (8 * vmax))
    planes = []
    for c in comps:
        pw, ph = mcux * 8 * c["h"], mcuy * 8 * c["v"]
        planes.append([0] * (pw * ph))
        c["pw"], c["ph"] = pw, ph
        if c["tq"] not in qtabs:
            raise ValueError(f"missing quantization table {c['tq']}")
    by_id = {c["id"]: (i, c) for i, c in enumerate(comps)}
    order = []
    for cs, td, ta in scomps:
        if cs not in by_id:
            raise ValueError(f"scan names unknown component {cs}")
        i, c = by_id[cs]
        if (0, td) not in huff or (1, ta) not in huff:
            raise ValueError(f"missing huffman table for component {cs}")
        order.append((i, c, huff[(0, td)], huff[(1, ta)]))
    r = _JpegBitReader(payload, pos)
    preds = [0] * len(comps)
    rst_expect = 0
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart and mcu_count and mcu_count % restart == 0:
                r.align_restart(rst_expect)
                rst_expect = (rst_expect + 1) % 8
                preds = [0] * len(comps)
            for i, c, dct, act in order:
                q = qtabs[c["tq"]]
                for bv in range(c["v"]):
                    for bh in range(c["h"]):
                        zz = [0] * 64
                        s = _jpeg_read_symbol(r, dct)
                        diff = _jpeg_extend(r.bits(s), s) if s else 0
                        preds[i] += diff
                        zz[0] = preds[i]
                        k = 1
                        while k < 64:
                            rs = _jpeg_read_symbol(r, act)
                            rr, ss = rs >> 4, rs & 0x0F
                            if ss == 0:
                                if rr == 15:
                                    k += 16  # ZRL
                                    continue
                                break  # EOB
                            k += rr
                            if k > 63:
                                raise ValueError("AC run past block end")
                            zz[k] = _jpeg_extend(r.bits(ss), ss)
                            k += 1
                        nat = [0] * 64
                        for zi in range(64):
                            nat[_JPEG_ZIGZAG[zi]] = zz[zi]
                        px = _jpeg_idct(nat, q)
                        pw = c["pw"]
                        bx0 = (mx * c["h"] + bh) * 8
                        by0 = (my * c["v"] + bv) * 8
                        plane = planes[i]
                        for rr2 in range(8):
                            dst = (by0 + rr2) * pw + bx0
                            plane[dst : dst + 8] = px[rr2 * 8 : rr2 * 8 + 8]
            mcu_count += 1
    # --- upsample + color convert ------------------------------------------
    nc = len(comps)
    if nc == 1:
        c = comps[0]
        pw = c["pw"]
        out = bytearray()
        for y in range(height):
            row = planes[0][y * pw : y * pw + width]
            out += bytes(row)
        return {
            "width": width, "height": height, "channels": 1,
            "pixels": bytes(out),
        }
    out = bytearray(width * height * 3)
    pws = [c["pw"] for c in comps]
    sx = [hmax // c["h"] for c in comps]
    sy = [vmax // c["v"] for c in comps]
    for y in range(height):
        yy = [planes[0][y * pws[0] + x] for x in range(width)]
        brow = (y // sy[1]) * pws[1]
        rrow = (y // sy[2]) * pws[2]
        base = y * width * 3
        for x in range(width):
            Y = yy[x]
            Cb = planes[1][brow + x // sx[1]] - 128
            Cr = planes[2][rrow + x // sx[2]] - 128
            r8 = int(Y + 1.402 * Cr + 0.5)
            g8 = int(Y - 0.344136286 * Cb - 0.714136286 * Cr + 0.5)
            b8 = int(Y + 1.772 * Cb + 0.5)
            o = base + x * 3
            out[o] = 0 if r8 < 0 else (255 if r8 > 255 else r8)
            out[o + 1] = 0 if g8 < 0 else (255 if g8 > 255 else g8)
            out[o + 2] = 0 if b8 < 0 else (255 if b8 > 255 else b8)
    return {
        "width": width, "height": height, "channels": 3,
        "pixels": bytes(out),
    }


# Executor shipping: mapInPandas closures that call these codecs would
# normally pickle them BY REFERENCE (module-level functions), and
# executor Python workers cannot import spype_spark when the caller put
# it on sys.path at runtime — exactly how the external harness runs.
# Registering the module for by-value pickling makes cloudpickle ship
# the codec code with the closure; the module is dependency-free
# (struct only), so the shipped payload is self-contained. This is the
# module-granular version of the repo's nested-def convention
# (ann.py:198).
def _register_for_executor_shipping() -> None:
    from pyspark import cloudpickle

    cloudpickle.register_pickle_by_value(sys.modules[__name__])


_register_for_executor_shipping()
