from .columns import (
    MEDIA_SCHEMA,
    attach_media,
    decode_image_stub,
    extract_features,
    frame_sample_stub,
)

__all__ = [
    "MEDIA_SCHEMA",
    "attach_media",
    "decode_image_stub",
    "extract_features",
    "frame_sample_stub",
]
