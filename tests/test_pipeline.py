"""End-to-end text pipeline: chunk -> embed -> store -> retrieve, plus
the pooling kernel and encoder determinism. Mirrors the reference's §3.3
lifecycle on the real documents table.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from mlx_vector_db_spark.pipeline import (
    HashingEncoder,
    TextPipeline,
    embed_texts,
    masked_mean_pool,
)
from mlx_vector_db_spark.store import VectorStoreCatalog

DIM = 64


def test_masked_mean_pool_matches_numpy_oracle():
    rng = np.random.default_rng(2)
    hidden = rng.random((3, 5, 4)).astype(np.float32)
    mask = np.array([[1, 1, 1, 0, 0], [1, 0, 0, 0, 0], [0, 0, 0, 0, 0]])
    got = masked_mean_pool(hidden, mask)
    exp0 = hidden[0, :3].mean(axis=0)
    assert got[0] == pytest.approx(exp0, abs=1e-6)
    assert got[1] == pytest.approx(hidden[1, 0], abs=1e-6)
    # fully masked row: denominator floored at 1e-9, result ~0 not NaN
    assert not np.isnan(got[2]).any() and np.abs(got[2]).max() < 1e-3


def test_hashing_encoder_properties():
    enc = HashingEncoder(DIM)
    a = enc(["the quick brown fox", "the quick brown fox", "totally different words"])
    assert a.shape == (3, DIM) and a.dtype == np.float32
    # deterministic + unit norm
    assert np.allclose(a[0], a[1])
    assert np.linalg.norm(a[0]) == pytest.approx(1.0, abs=1e-5)
    # shared vocabulary => higher cosine than disjoint vocabulary
    sim_same = float(a[0] @ a[1])
    sim_diff = float(a[0] @ a[2])
    assert sim_same == pytest.approx(1.0, abs=1e-5) and sim_diff < 0.5


def test_embed_texts_batching(spark):
    df = spark.createDataFrame(
        [(i, f"text number {i}") for i in range(100)], "id long, chunk_text string"
    )
    out = embed_texts(df, HashingEncoder(16), dim=16, batch_size=7)
    rows = out.collect()
    assert len(rows) == 100
    assert all(len(r["embedding"]) == 16 for r in rows)
    # same text encodes identically regardless of batch boundary
    one = embed_texts(df.where("id = 13"), HashingEncoder(16), dim=16).first()
    full = [r for r in rows if r["id"] == 13][0]
    assert one["embedding"] == full["embedding"]


def test_embed_texts_bad_encoder_shape(spark):
    df = spark.createDataFrame([(0, "x")], "id long, chunk_text string")
    bad = lambda texts: np.zeros((len(texts), 3), dtype=np.float32)  # noqa: E731
    with pytest.raises(Exception, match="expected"):
        embed_texts(df, bad, dim=16).collect()


@pytest.fixture()
def pipeline(spark, tmp_path, sf_small):
    cat = VectorStoreCatalog(spark, tmp_path / "stores")
    store = cat.create_store(
        "rag", "hash64", dimension=DIM, metric="cosine",
        promoted_keys={
            "document_id": "long",
            "chunk_index": "int",
            "chunk_text": "string",
            "chunk_length": "int",
            "document_source": "string",
        },
    )
    return TextPipeline(store, HashingEncoder(DIM))


def test_index_and_retrieve_real_documents(spark, pipeline, sf_small):
    docs = spark.read.parquet(f"{sf_small}/documents.parquet").limit(100)
    n_chunks = pipeline.index_documents(docs, chunk_size=300, overlap=30)
    assert n_chunks >= 100
    assert pipeline.store.count() == n_chunks

    # retrieval: querying with a document's own text must surface one of
    # that document's chunks at rank 1 (hashing encoder => exact
    # vocabulary match dominates)
    target = docs.where("doc_id = 7").first()
    hits = pipeline.search_similar_texts(target["text"], k=3).collect()
    assert hits[0]["document_id"] == 7
    assert hits[0]["similarity"] > 0.8

    ctx = pipeline.retrieve_context(
        target["text"], k=2, min_similarity=0.2, max_context_length=2000
    ).collect()
    assert ctx and all(r["similarity"] >= 0.2 for r in ctx)

    prompt = pipeline.answer_prompt(
        target["text"][:60], k=2, min_similarity=0.0, max_context_length=1500
    )
    assert "Question:" in prompt and "[Source 1:" in prompt


def test_indexed_chunks_inherit_store_features(spark, pipeline, sf_small):
    docs = spark.read.parquet(f"{sf_small}/documents.parquet").limit(30)
    pipeline.index_documents(docs)
    df = pipeline.store.to_df()
    # norms precomputed on the embedding column
    row = df.first()
    assert row["norm"] == pytest.approx(1.0, abs=1e-5)  # encoder normalizes
    # metadata filter works on promoted chunk columns
    res = pipeline.search_similar_texts(
        "anything", k=5, filter_metadata={"document_id": 3}
    ).collect()
    assert res and all(r["document_id"] == 3 for r in res)


def test_random_projection_encoder_properties():
    """Model-shaped 384-dim encoder: deterministic across instances and
    pickling (the table rebuilds from the seed in each worker), unit
    norm, and semantically meaningful (shared vocabulary => higher
    cosine than disjoint vocabulary)."""
    import pickle

    from mlx_vector_db_spark.pipeline import RandomProjectionEncoder

    enc = RandomProjectionEncoder(384, seed=7)
    texts = ["the quick brown fox", "the quick brown dog", "entirely different words here"]
    a = enc(texts)
    assert a.shape == (3, 384) and a.dtype == np.float32
    assert np.allclose(np.linalg.norm(a, axis=1), 1.0, atol=1e-5)
    b = pickle.loads(pickle.dumps(RandomProjectionEncoder(384, seed=7)))(texts)
    assert np.array_equal(a, b)
    sim_near = float(a[0] @ a[1])
    sim_far = float(a[0] @ a[2])
    assert sim_near > sim_far
    # empty text encodes to the zero-norm guard, not NaN
    z = enc([""])
    assert np.all(np.isfinite(z))


def test_pipeline_end_to_end_384(spark, tmp_path, sf_small):
    """TextPipeline at sentence-transformer dim: index + retrieve with
    the RandomProjectionEncoder proves the Arrow batch contract at
    realistic width (the reference embeds at model dim, not hash width)."""
    from mlx_vector_db_spark.pipeline import RandomProjectionEncoder, TextPipeline

    cat = VectorStoreCatalog(spark, tmp_path / "stores384")
    store = cat.create_store(
        "p384", "m", dimension=384,
        promoted_keys={"document_id": "long", "chunk_index": "int",
                       "chunk_text": "string", "chunk_length": "int"},
    )
    pipe = TextPipeline(store, RandomProjectionEncoder(384))
    docs = spark.read.parquet(f"{sf_small}/documents.parquet").limit(20)
    n = pipe.index_documents(docs, source_col=None)
    assert n == store.count() > 0
    assert len(store.to_df().first()["embedding"]) == 384
    target = docs.where(F.col("doc_id") == docs.first()["doc_id"]).first()
    hits = pipe.search_similar_texts(target["text"], k=3).collect()
    # the document's own chunk is the nearest neighbor of its text
    assert hits and hits[0]["document_id"] == target["doc_id"]


def test_default_encoder_fallback_contract():
    """default_encoder returns a real sentence-transformers adapter when
    the library is installed, else the model-shaped deterministic
    fallback — both satisfy the Encoder contract at the same dim."""
    from mlx_vector_db_spark.pipeline import (
        RandomProjectionEncoder,
        SentenceTransformerEncoder,
        default_encoder,
    )
    import importlib.util

    enc = default_encoder(dim=384)
    have_lib = importlib.util.find_spec("sentence_transformers") is not None
    if have_lib:
        assert isinstance(enc, SentenceTransformerEncoder)
    else:
        assert isinstance(enc, RandomProjectionEncoder)
        with pytest.raises(ImportError, match="sentence-transformers"):
            SentenceTransformerEncoder()
    out = enc(["hello world", "the quick brown fox"])
    assert out.shape == (2, 384) and out.dtype == np.float32
    # L2-normalized like the reference encode stage
    assert np.allclose(np.linalg.norm(out, axis=1), 1.0, atol=1e-3)


@pytest.mark.skipif(
    __import__("importlib.util", fromlist=["util"]).find_spec(
        "sentence_transformers"
    )
    is None,
    reason="sentence-transformers not installed",
)
def test_sentence_transformer_encoder_pickle_ships_name_only():
    import pickle

    from mlx_vector_db_spark.pipeline import SentenceTransformerEncoder

    enc = SentenceTransformerEncoder()
    enc(["warm"])  # force model load
    state = pickle.dumps(enc)
    assert len(state) < 10_000  # weights never ride the closure
    clone = pickle.loads(state)
    a, b = enc(["same text"]), clone(["same text"])
    assert np.allclose(a, b, atol=1e-6)


def test_pretraining_export_composition(spark, tmp_path):
    """The pretraining data path end-to-end: curation (lang + token
    filters + dedup keeper) -> token-budget packing -> deterministic
    sharded export. Invariants: every curated doc is exported exactly
    once, every pack bin respects the budget, and re-exporting yields
    an identical manifest (retry-stable)."""
    import pyspark.sql.functions as F

    from mlx_vector_db_spark.operators.packing import greedy_pack
    from mlx_vector_db_spark.queries import q_curation_pipeline
    from mlx_vector_db_spark.sources.export import export_shards, read_shards

    en = "the quick brown fox and the lazy dog of the town keep running "
    rows = [(i, en * 2 + f"tail{i}") for i in range(30)]
    rows += [(100, rows[0][1]), (101, "short of it")]  # dup + too-short
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    docs.write.parquet(str(tmp_path / "documents.parquet"))

    curated = q_curation_pipeline(spark, str(tmp_path))
    packed = greedy_pack(curated, token_col="n_bpe_tokens", budget=256)
    # bins respect the budget
    over = (
        packed.groupBy("bin_id")
        .agg(F.sum("n_bpe_tokens").alias("t"))
        .where(F.col("t") > 256)
        .count()
    )
    assert over == 0

    out = str(tmp_path / "shards")
    m1 = {r["shard"]: r["n_rows"] for r in export_shards(packed, out, n_shards=4).collect()}
    back = read_shards(spark, out)
    assert back.count() == curated.count() == 30  # dup 100 + short 101 dropped
    assert sorted(r["doc_id"] for r in back.select("doc_id").collect()) == sorted(
        r["doc_id"] for r in curated.select("doc_id").collect()
    )
    # deterministic re-export: identical manifest
    m2 = {r["shard"]: r["n_rows"] for r in export_shards(packed, out, n_shards=4).collect()}
    assert m1 == m2
