"""Bulk readers (jsonl/csv/npz) + validation, and the multimodal
binary-column plumbing with the deterministic fake decoder.
"""

from __future__ import annotations

import json

import numpy as np
import pytest
from pyspark.sql import functions as F

from mlx_vector_db_spark.multimodal import (
    decode_and_featurize,
    fake_image_decoder,
    sample_video_frames,
)
from mlx_vector_db_spark.operators.knn import knn_join
from mlx_vector_db_spark.sources import (
    read_vectors_csv,
    read_vectors_jsonl,
    read_vectors_npz,
    validate_vectors_df,
)

RNG = np.random.default_rng(17)


def test_read_jsonl(spark, tmp_path):
    path = tmp_path / "vecs.jsonl"
    recs = [
        {"vector": RNG.random(4).round(4).tolist(), "metadata": {"k": str(i)}}
        for i in range(20)
    ]
    path.write_text("\n".join(json.dumps(r) for r in recs))
    df = read_vectors_jsonl(spark, str(path))
    rows = df.orderBy("id").collect()
    assert len(rows) == 20
    assert rows[3]["embedding"] == pytest.approx(recs[3]["vector"], abs=1e-6)
    assert rows[3]["meta"] == {"k": "3"}
    validate_vectors_df(df, 4)


def test_read_csv(spark, tmp_path):
    path = tmp_path / "vecs.csv"
    lines = ["vector,category"]
    for i in range(10):
        v = ";".join(str(round(x, 4)) for x in RNG.random(3))
        lines.append(f"{v},cat{i % 2}")
    path.write_text("\n".join(lines))
    df = read_vectors_csv(spark, str(path))
    rows = df.collect()
    assert len(rows) == 10
    assert all(len(r["embedding"]) == 3 for r in rows)
    assert rows[0]["meta"].keys() == {"category"}
    validate_vectors_df(df, 3)


def test_read_orc_roundtrip(spark, tmp_path):
    from mlx_vector_db_spark.sources import read_vectors_orc

    path = str(tmp_path / "vecs_orc")
    src = spark.createDataFrame(
        [(i, [float(i), float(i) + 0.5], {"k": str(i)}) for i in range(12)],
        "id long, embedding array<float>, meta map<string,string>",
    )
    src.write.orc(path)
    df = read_vectors_orc(spark, path)
    rows = {r.id: r for r in df.collect()}
    assert len(rows) == 12
    assert rows[3].embedding == pytest.approx([3.0, 3.5])
    assert rows[3].meta == {"k": "3"}
    validate_vectors_df(df, 2)


def test_read_orc_synthesizes_missing_columns(spark, tmp_path):
    from mlx_vector_db_spark.sources import read_vectors_orc

    path = str(tmp_path / "vecs_orc_bare")
    spark.createDataFrame(
        [([0.1, 0.2],), ([0.3, 0.4],)], "embedding array<double>"
    ).write.orc(path)
    df = read_vectors_orc(spark, path)
    rows = df.collect()
    assert len(rows) == 2
    assert df.schema["embedding"].dataType.simpleString() == "array<float>"
    assert all(r.meta == {} for r in rows)
    with pytest.raises(ValueError):
        spark.createDataFrame([(1,)], "x long").write.orc(str(tmp_path / "noemb"))
        read_vectors_orc(spark, str(tmp_path / "noemb"))


def test_read_csv_missing_vector_column(spark, tmp_path):
    path = tmp_path / "bad.csv"
    path.write_text("a,b\n1,2")
    with pytest.raises(ValueError, match="no 'vector' column"):
        read_vectors_csv(spark, str(path))


def test_read_npz(spark, tmp_path):
    path = tmp_path / "vecs.npz"
    mat = RNG.random((15, 6)).astype(np.float32)
    np.savez(path, vectors=mat)
    df = read_vectors_npz(spark, str(path))
    rows = df.orderBy("id").collect()
    assert len(rows) == 15
    assert rows[2]["meta"] == {"id": "bulk_2"}
    assert rows[2]["embedding"] == pytest.approx(mat[2].tolist(), abs=1e-6)
    with pytest.raises(ValueError, match="no array"):
        read_vectors_npz(spark, str(path), array_name="nope")


def test_validate_catches_bad_rows(spark):
    ok = spark.createDataFrame(
        [(0, [1.0, 2.0])], "id long, embedding array<float>"
    )
    validate_vectors_df(ok, 2)
    with pytest.raises(ValueError, match="dimension"):
        validate_vectors_df(ok, 3)
    nan_df = spark.createDataFrame(
        [(0, [1.0, float("nan")])], "id long, embedding array<float>"
    )
    with pytest.raises(ValueError, match="NaN"):
        validate_vectors_df(nan_df, 2)


# --- multimodal plumbing


@pytest.fixture()
def media(spark):
    rows = [
        (i, "image", bytes(RNG.integers(0, 256, 64, dtype=np.uint8)),
         "image/fake", 8, 8, None, {"src": f"s{i}"})
        for i in range(10)
    ] + [
        (100, "video", b"\x00" * 32, "video/fake", None, None, 3500, {}),
    ]
    from mlx_vector_db_spark.multimodal import MEDIA_SCHEMA
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_decode_and_featurize_deterministic(spark, media):
    dec = fake_image_decoder(dim=16)
    out1 = decode_and_featurize(media.where("modality = 'image'"), dec, dim=16)
    out2 = decode_and_featurize(media.where("modality = 'image'"), dec, dim=16)
    a = {r["media_id"]: r["embedding"] for r in out1.collect()}
    b = {r["media_id"]: r["embedding"] for r in out2.collect()}
    assert a == b and len(a) == 10
    assert all(len(v) == 16 for v in a.values())


def test_media_features_feed_knn(spark, media):
    dec = fake_image_decoder(dim=16)
    feats = decode_and_featurize(media.where("modality = 'image'"), dec, dim=16)
    queries = feats.where("media_id < 2").select(
        F.col("media_id").alias("query_id"), "embedding"
    )
    res = knn_join(feats, queries, k=1, id_col="media_id")
    top = {r["query_id"]: r["media_id"] for r in res.collect()}
    assert top == {0: 0, 1: 1}  # self-match end to end through binary decode


def test_video_frame_sampling(spark, media):
    frames = sample_video_frames(media, every_ms=1000)
    ts = [r["frame_ts_ms"] for r in frames.orderBy("frame_ts_ms").collect()]
    assert ts == [0, 1000, 2000, 3000]


def test_pil_decoder_is_explicit_stub():
    from mlx_vector_db_spark.multimodal.blobs import pil_image_decoder

    try:
        import PIL  # noqa: F401
        pytest.skip("PIL unexpectedly present")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError, match="PIL"):
        pil_image_decoder()
