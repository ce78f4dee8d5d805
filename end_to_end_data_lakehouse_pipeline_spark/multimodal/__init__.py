"""Multimodal columns: binary payloads + typed metadata over mapInPandas."""

from .columns import (  # noqa: F401
    MEDIA_SCHEMA,
    decode_features,
    frame_sample,
    make_media_df,
    resize_images,
)
