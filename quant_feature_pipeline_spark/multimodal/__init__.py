from .binaryops import (
    attach_media_metadata,
    decode_image_features,
    frame_sample_plan,
    resize_plan,
    synth_media_table,
)

__all__ = [
    "attach_media_metadata",
    "decode_image_features",
    "frame_sample_plan",
    "resize_plan",
    "synth_media_table",
]
