"""Pure-stdlib WAV (RIFF PCM) codec: real bytes in, real samples out.

Implements the public RIFF/WAVE container format (multimedia programming
interface spec: little-endian chunks, ``fmt `` + ``data``) for 16-bit
PCM with ``struct`` only — no audio library required. This gives the
multimodal audio path a REAL decode step (the analogue of
multimodal/png.py for images): actual sample values out of actual
container bytes, so feature extraction (duration, energy) is computed
from decoded audio, not metadata trust.

Scope: PCM 16-bit signed little-endian, any channel count/sample rate,
chunk walking that tolerates extra chunks (LIST/INFO etc.) and odd-size
chunk padding per the RIFF spec. Compressed formats (MP3/AAC/float PCM)
are out of scope — ``decode_wav`` raises ``NotImplementedError`` for
them, the swap-in point for pyav/ffmpeg in real deployments.
"""

from __future__ import annotations

import struct

_PCM_FORMAT = 1


def encode_wav(sample_rate: int, channels: int, samples: list[int]) -> bytes:
    """Encode interleaved 16-bit PCM samples into a WAV container.

    ``samples`` are interleaved across channels (frame-major) and must
    be a multiple of ``channels`` long; values are clamped to int16.
    """
    if channels <= 0 or sample_rate <= 0:
        raise ValueError("channels and sample_rate must be positive")
    if len(samples) % channels:
        raise ValueError("sample count must be a multiple of channels")
    clamped = [max(-32768, min(32767, int(s))) for s in samples]
    data = struct.pack(f"<{len(clamped)}h", *clamped)
    block_align = channels * 2
    fmt = struct.pack(
        "<HHIIHH",
        _PCM_FORMAT,
        channels,
        sample_rate,
        sample_rate * block_align,
        block_align,
        16,
    )
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    if len(data) % 2:
        body += b"\x00"  # RIFF chunks are word-aligned
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes) -> tuple[int, int, int, list[int]]:
    """Decode a WAV container to (sample_rate, channels, n_frames, samples).

    Walks the RIFF chunk list (skipping non-fmt/data chunks, honoring
    the odd-size pad byte), validates the PCM16 format, and unpacks the
    interleaved samples. Raises ``ValueError`` for a malformed container
    and ``NotImplementedError`` for non-PCM16 encodings.
    """
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE container")
    riff_size = struct.unpack_from("<I", data, 4)[0]
    if riff_size + 8 > len(data):
        raise ValueError("truncated RIFF container")
    pos, end = 12, 8 + riff_size
    fmt = None
    pcm = None
    while pos + 8 <= end:
        cid = data[pos : pos + 4]
        size = struct.unpack_from("<I", data, pos + 4)[0]
        payload = data[pos + 8 : pos + 8 + size]
        if len(payload) < size:
            raise ValueError(f"truncated {cid!r} chunk")
        if cid == b"fmt ":
            if size < 16:
                raise ValueError("fmt chunk too short")
            fmt = struct.unpack_from("<HHIIHH", payload, 0)
        elif cid == b"data":
            pcm = payload
        pos += 8 + size + (size % 2)  # pad byte on odd-size chunks
    if fmt is None or pcm is None:
        raise ValueError("missing fmt or data chunk")
    audio_format, channels, sample_rate, _byte_rate, _block_align, bits = fmt
    if audio_format != _PCM_FORMAT or bits != 16:
        raise NotImplementedError(
            "only PCM16 decodes without an audio library; swap in "
            "pyav/ffmpeg here (decode_wav) for compressed formats"
        )
    n = len(pcm) // 2
    samples = list(struct.unpack(f"<{n}h", pcm[: n * 2]))
    if channels <= 0 or n % channels:
        raise ValueError("sample count not a multiple of channels")
    if sample_rate <= 0:
        # a structurally valid header can still declare rate 0; letting
        # it through turns into ZeroDivisionError in audio_features —
        # outside the documented ValueError contract a quarantine
        # pipeline keys on
        raise ValueError(f"invalid sample rate {sample_rate}")
    return sample_rate, channels, n // channels, samples


def audio_features(data: bytes) -> dict:
    """Decode and summarize: duration, per-sample sums, peak.

    Integer sums (not float RMS) so downstream aggregates stay
    bit-exact across engines.
    """
    sample_rate, channels, n_frames, samples = decode_wav(data)
    return {
        "sample_rate": sample_rate,
        "channels": channels,
        "n_frames": n_frames,
        "duration_ms": n_frames * 1000 // sample_rate,
        "sample_sum": sum(samples),
        "abs_sum": sum(abs(s) for s in samples),
        "peak": max((abs(s) for s in samples), default=0),
    }


def resample_nearest(samples: list[int], channels: int, n_from: int, n_to: int) -> list[int]:
    """Nearest-neighbor resample from ``n_from`` to ``n_to`` frames."""
    if n_from <= 0:
        return []
    out: list[int] = []
    for i in range(n_to):
        src = i * n_from // n_to
        out.extend(samples[src * channels : (src + 1) * channels])
    return out
