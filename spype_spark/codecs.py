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
    if bits == 16:
        samples = [
            struct.unpack_from("<h", data, f * block)[0]
            for f in range(n_frames)
        ]
    else:
        samples = [data[f * block] for f in range(n_frames)]
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
