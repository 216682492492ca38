from mlx_vector_db_spark.multimodal.blobs import (
    MEDIA_SCHEMA,
    decode_and_featurize,
    fake_image_decoder,
    sample_video_frames,
)

__all__ = [
    "MEDIA_SCHEMA",
    "decode_and_featurize",
    "fake_image_decoder",
    "sample_video_frames",
]
