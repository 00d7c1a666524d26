"""Real, dependency-free media codecs for the multimodal column stack.

The container ships no image/audio libraries, but two ubiquitous
formats are simple enough to parse exactly with the standard library:
uncompressed 24-bpp BI_RGB **BMP** (BITMAPFILEHEADER + BITMAPINFOHEADER
+ padded bottom-up pixel rows) and **WAV** PCM (RIFF container, fmt
chunk, 8/16-bit samples). These are REAL decoders — they accept any
conforming file produced by any tool, validate the headers, and raise
:class:`ValueError` on malformed input — registered into
:data:`spype_spark.queries.multimodal.REAL_DECODERS` so the decode
contract exercises an actual codec branch instead of the byte-level
fake. The matching encoders exist to build byte-exact test fixtures
and to wrap corpus bytes into valid media payloads inside contracts.

Everything is pure ``struct`` parsing over ``bytes`` — executor-side
under ``mapInPandas``, no driver involvement, no external imports — so
the 100 TB story is unchanged: Arrow hands the payload batch to
Python, the codec walks it, features come back columnar.
"""

from __future__ import annotations

import struct
import sys

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
