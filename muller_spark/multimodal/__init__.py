from muller_spark.multimodal.media import (
    decode_image_batch,
    extract_audio_features,
    extract_image_features,
    resize_images,
    sample_video_frames,
)

__all__ = [
    "decode_image_batch",
    "extract_audio_features",
    "extract_image_features",
    "resize_images",
    "sample_video_frames",
]
