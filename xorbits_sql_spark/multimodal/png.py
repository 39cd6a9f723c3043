"""Minimal real PNG codec (pure stdlib: zlib + struct).

The container has no image libraries (PIL/cv2), but PNG itself is just
zlib + per-scanline filters, both implementable from the public spec
(RFC 2083). This gives the multimodal operators a *real* decode path —
actual pixels out of actual compressed bytes — rather than a stub, for
the dominant lossless training-data format. Baseline JPEG decodes for
real too since round 8 (see ``jpeg.py``); video containers beyond the
in-repo PNGV format remain stubbed (swap in pyav in real deployments).

Supported: 8-bit depth, color types 0 (gray), 2 (RGB), 4 (gray+alpha),
6 (RGBA); all five scanline filters (None/Sub/Up/Average/Paeth); CRC
validation; multiple IDAT chunks. Rejected: palette, interlace, 16-bit.

Per-pixel Python loops are fine here because the Spark boundary is
Arrow-batched ``mapInPandas`` — decode cost is per payload, and tiny
thumbnails are the unit of work in the test pipeline. A production
deployment swaps PIL into the same function signatures.
"""

from __future__ import annotations

import struct
import zlib

_SIGNATURE = b"\x89PNG\r\n\x1a\n"

_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


class PngError(ValueError):
    pass


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(data: bytes) -> tuple[int, int, int, bytes]:
    """Decode a PNG payload → (width, height, channels, raw pixel bytes).

    Pixel bytes are row-major, ``channels`` interleaved samples per
    pixel, fully de-filtered.
    """
    if not data.startswith(_SIGNATURE):
        raise PngError("not a PNG (bad signature)")
    pos = len(_SIGNATURE)
    width = height = None
    channels = 0
    idat = bytearray()
    seen_end = False
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if len(body) != length:
            raise PngError("truncated chunk")
        if pos + 12 + length > len(data):
            # a slice ending inside the 4-byte CRC would feed
            # struct.unpack a short buffer — struct.error escapes the
            # PngError contract quarantine pipelines catch
            raise PngError("truncated chunk CRC")
        (crc,) = struct.unpack(">I", data[pos + 8 + length : pos + 12 + length])
        if zlib.crc32(ctype + body) & 0xFFFFFFFF != crc:
            raise PngError(f"CRC mismatch in {ctype!r}")
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if bit_depth != 8:
                raise PngError(f"unsupported bit depth {bit_depth}")
            if color_type not in _CHANNELS:
                raise PngError(f"unsupported color type {color_type}")
            if comp != 0 or filt != 0:
                raise PngError("unsupported compression/filter method")
            if interlace != 0:
                raise PngError("interlaced PNG unsupported")
            channels = _CHANNELS[color_type]
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            seen_end = True
            break
        pos += 12 + length
    if width is None or not seen_end:
        raise PngError("missing IHDR/IEND")
    if width <= 0 or height <= 0:
        raise PngError("invalid image dimensions")
    stride = width * channels
    expected = (stride + 1) * height
    # Bounded decompression: the expected raw size is known from IHDR,
    # and an unbounded zlib.decompress would materialize a zlib bomb
    # (1 KB compressing to GBs, valid CRCs) in executor memory before
    # the size check could reject it. max_length caps the expansion;
    # feeding the unconsumed tail back distinguishes an oversized
    # stream (more output follows) from the exact one (only the adler
    # trailer remains).
    dobj = zlib.decompressobj()
    raw = dobj.decompress(bytes(idat), expected)
    if dobj.unconsumed_tail and dobj.decompress(dobj.unconsumed_tail, 1):
        raise PngError("IDAT size mismatch")
    if len(raw) != expected:
        raise PngError("IDAT size mismatch")
    # unconsumed_tail only covers unexpanded INPUT of the same stream;
    # garbage bytes AFTER a complete zlib stream land in unused_data
    # and would otherwise pass silently.
    if dobj.unused_data:
        raise PngError("trailing garbage after IDAT zlib stream")
    out = bytearray(stride * height)
    prev = bytearray(stride)
    for y in range(height):
        off = y * (stride + 1)
        ftype = raw[off]
        line = bytearray(raw[off + 1 : off + 1 + stride])
        if ftype == 1:  # Sub
            for i in range(channels, stride):
                line[i] = (line[i] + line[i - channels]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                a = line[i - channels] if i >= channels else 0
                line[i] = (line[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                a = line[i - channels] if i >= channels else 0
                c = prev[i - channels] if i >= channels else 0
                line[i] = (line[i] + _paeth(a, prev[i], c)) & 0xFF
        elif ftype != 0:
            raise PngError(f"unknown filter type {ftype}")
        out[y * stride : (y + 1) * stride] = line
        prev = line
    return width, height, channels, bytes(out)


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def encode_png(width: int, height: int, channels: int, pixels: bytes) -> bytes:
    """Encode raw row-major pixel bytes as an 8-bit PNG (filter 0 rows)."""
    color_type = {1: 0, 3: 2, 2: 4, 4: 6}.get(channels)
    if color_type is None:
        raise PngError(f"unsupported channel count {channels}")
    stride = width * channels
    if len(pixels) != stride * height:
        raise PngError("pixel buffer does not match dimensions")
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    raw = b"".join(
        b"\x00" + pixels[y * stride : (y + 1) * stride] for y in range(height)
    )
    return (
        _SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 6))
        + _chunk(b"IEND", b"")
    )


def resize_nearest(
    pixels: bytes, width: int, height: int, channels: int, new_w: int, new_h: int
) -> bytes:
    """Nearest-neighbor resample of raw pixel bytes."""
    if new_w <= 0 or new_h <= 0:
        raise PngError("target dimensions must be positive")
    out = bytearray(new_w * new_h * channels)
    for y in range(new_h):
        sy = y * height // new_h
        src_row = sy * width * channels
        dst_row = y * new_w * channels
        for x in range(new_w):
            sx = x * width // new_w
            s = src_row + sx * channels
            d = dst_row + x * channels
            out[d : d + channels] = pixels[s : s + channels]
    return bytes(out)
