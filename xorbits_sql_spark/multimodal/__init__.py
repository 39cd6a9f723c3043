"""Multimodal column support: images/audio/video as opaque binary columns.

The reference has no multimodal surface; this package is part of the
pipeline-extension surface (BASELINE.json). See ``media``.
"""

from .media import (
    MEDIA_SCHEMA,
    attach_fake_media,
    decode_audio,
    decode_image,
    explode_frames,
    extract_media_features,
    media_struct,
    resize_image,
    sample_frames,
    transform_media,
)

__all__ = [
    "MEDIA_SCHEMA",
    "media_struct",
    "attach_fake_media",
    "decode_audio",
    "decode_image",
    "resize_image",
    "sample_frames",
    "transform_media",
    "explode_frames",
    "extract_media_features",
]
