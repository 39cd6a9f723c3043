"""Minimal frame-container ("PNGV") codec — a real, pure-stdlib stand-in
for video decode in environments without ffmpeg/pyav.

Layout: ``b'PNGV' | uint32 n_frames | (uint32 len | PNG bytes) * n``.
Each frame is a full PNG (multimodal/png.py — zlib + scanline filters,
CRC-checked), so "decode a sampled frame" exercises a genuine image
codec, not a fake. The container is intentionally trivial: the Spark
side of a video pipeline (binary column in, evenly-spaced frame
sampling, per-frame decode in Arrow batches) is identical whether the
payload is PNGV or mp4 — swap :func:`decode_pngv` for an ffmpeg demux
to go to production.
"""

from __future__ import annotations

import struct

MAGIC = b"PNGV"


def encode_pngv(frames: list[bytes]) -> bytes:
    """Pack PNG-encoded frames into one binary payload."""
    parts = [MAGIC, struct.pack(">I", len(frames))]
    for f in frames:
        parts.append(struct.pack(">I", len(f)))
        parts.append(f)
    return b"".join(parts)


def decode_pngv(data: bytes) -> list[bytes]:
    """Unpack a PNGV payload back into its PNG frames."""
    if data[:4] != MAGIC:
        raise ValueError("not a PNGV payload")
    if len(data) < 8:
        raise ValueError("truncated PNGV payload (header)")
    (n,) = struct.unpack(">I", data[4:8])
    frames, off = [], 8
    for _ in range(n):
        if off + 4 > len(data):
            raise ValueError("truncated PNGV payload (frame length prefix)")
        (ln,) = struct.unpack(">I", data[off : off + 4])
        off += 4
        if off + ln > len(data):
            raise ValueError("truncated PNGV payload (frame body)")
        frames.append(data[off : off + ln])
        off += ln
    if off != len(data):
        raise ValueError("trailing bytes in PNGV payload")
    return frames


def sample_indices(n_frames: int, k: int) -> list[int]:
    """Evenly-spaced frame indices (first and last always included).

    ``idx_j = j*(n-1) // (k-1)`` — pure integer arithmetic so an SQL
    oracle can predict the exact sampled set; duplicates appear when
    k > n (deterministic, callers may dedupe). Degenerate shapes:
    zero requested samples or a zero-frame container yield [] (the
    old [0]-padding made sample_pngv IndexError on valid empty videos
    and return one frame when none were requested).
    """
    if k <= 0 or n_frames <= 0:
        return []
    if k == 1 or n_frames == 1:
        return [0] * k
    return [j * (n_frames - 1) // (k - 1) for j in range(k)]


def sample_pngv(data: bytes, k: int) -> list[tuple[int, bytes]]:
    """Return ``k`` evenly-spaced (index, png_bytes) samples."""
    frames = decode_pngv(data)
    return [(i, frames[i]) for i in sample_indices(len(frames), k)]
