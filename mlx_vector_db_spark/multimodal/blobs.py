"""Multimodal columns: opaque binary payloads + typed metadata.

Beyond-reference surface (SURVEY.md §7.3 milestone 6): image/audio/video
travel as ``binary`` columns with a typed metadata struct; decode /
feature-extract / resize / frame-sample run as Arrow-batched Pandas UDFs
over ``mapInPandas`` so the bytes never leave the executor and the
operator parallelizes per input partition (the 100 TB shape: media
lakes are partitioned by modality/date; nothing here shuffles).

The container ships no image/audio codecs, so the actual decode is
pluggable: ``fake_image_decoder`` is a deterministic stand-in (seeded by
the payload hash) used by tests; ``pil_image_decoder`` is the real one
gated behind an import-try and raises NotImplementedError when PIL is
absent. The Spark-side plumbing — schema, batch iteration, UDF
signatures, output shapes — is real and tested either way.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: canonical media-lake schema: payload + typed metadata
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), False),
        T.StructField("mime_type", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

Decoder = Callable[[bytes], np.ndarray]


def fake_image_decoder(dim: int = 64) -> Decoder:
    """Deterministic stand-in decoder: payload bytes -> pseudo feature
    vector seeded by the payload's sha256. Lets the full pipeline
    (schema, batching, downstream kNN) be exercised without codecs."""

    def decode(payload: bytes) -> np.ndarray:
        seed = int.from_bytes(hashlib.sha256(payload).digest()[:8], "big")
        rng = np.random.default_rng(seed)
        return rng.random(dim, dtype=np.float64).astype(np.float32)

    return decode


def pil_image_decoder(dim: int = 64) -> Decoder:
    """Real image decode + trivial downsample features. STUB in this
    container: PIL is not installed, so constructing it raises."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError as exc:  # pragma: no cover - image libs absent here
        raise NotImplementedError(
            "image decoding requires PIL, which is not available in this "
            "environment; use fake_image_decoder for plumbing tests"
        ) from exc

    def decode(payload: bytes) -> np.ndarray:  # pragma: no cover
        import io

        from PIL import Image

        img = Image.open(io.BytesIO(payload)).convert("L").resize((8, 8))
        arr = np.asarray(img, dtype=np.float32).reshape(-1)
        return np.resize(arr / 255.0, dim).astype(np.float32)

    return decode


def decode_and_featurize(
    media: DataFrame,
    decoder: Decoder,
    dim: int,
    payload_col: str = "payload",
    id_col: str = "media_id",
) -> DataFrame:
    """binary payload -> ``embedding array<float>`` via mapInPandas.

    Output: (id, embedding, n_bytes). Batch shape: each Arrow batch maps
    to one pandas DataFrame; the decoder runs per row inside the batch
    (codec work is inherently per-payload) but transfer and schema
    handling are columnar.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            feats = [decoder(bytes(p)).tolist() for p in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "embedding": feats,
                    "n_bytes": pdf[payload_col].map(len),
                }
            )

    return media.select(id_col, payload_col).mapInPandas(
        run, schema=f"{id_col} long, embedding array<float>, n_bytes long"
    )


def sample_video_frames(
    media: DataFrame,
    every_ms: int = 1000,
    id_col: str = "media_id",
) -> DataFrame:
    """Frame-sampling plan for video rows: one output row per sampled
    timestamp (decode itself is pluggable/stubbed like images). The
    sampling grid is pure column math — ``sequence(0, duration, step)``
    + explode — so the expensive part stays declarative and prunable."""
    vids = media.where(F.col("modality") == "video").where(
        F.col("duration_ms").isNotNull()
    )
    return vids.select(
        id_col,
        "payload",
        F.explode(
            F.sequence(
                F.lit(0),
                F.col("duration_ms"),
                F.lit(int(every_ms)),
            )
        ).alias("frame_ts_ms"),
    )
