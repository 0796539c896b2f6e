"""Multimodal columns: image/audio/video as opaque binary + typed metadata."""

from linqonsteroids_spark.multimodal.media import (  # noqa: F401
    MEDIA_SCHEMA,
    attach_fake_media,
    decode_image_stats,
    sample_video_frames,
)
