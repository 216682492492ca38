"""Text embedding pipeline: documents -> chunks -> embeddings -> store ->
retrieval (the reference's MLXLMPipeline, SURVEY.md §3.3, rebuilt on
DataFrames).

Reference flow (integrations/mlx_lm_pipeline.py):
``index_documents`` chunks each document (:646-694), embeds chunks in
batches of 32 (tokenize -> model forward -> masked mean-pool ->
L2-normalize, :323-397), and adds them to the vector store with chunk
metadata (:667-676). ``retrieve_context`` embeds the query and runs the
§3.1 search path with threshold + context packing (:725-765).

Spark rebuild: chunking is the Pandas-UDF explode (functions.text),
embedding is a ``mapInPandas`` stage with a pluggable encoder (Arrow
batches in, float32 vectors out — the UDF shape any real model server /
sentence-transformers backend drops into), and the store append is the
normal VectorStore path, so embeddings inherit norms + index columns.

No ML runtime ships in this container, so the default encoder is
:class:`HashingEncoder` — the feature-hashing trick (token -> bucket via
xxhash, L2-normalized counts). It is deterministic, dependency-free,
and semantically meaningful (shared vocabulary => cosine similarity),
which makes the end-to-end retrieval tests real rather than mocked.
:func:`masked_mean_pool` implements the reference's pooling kernel (F6)
for backends that return token-level states.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mlx_vector_db_spark.functions.text import chunk_documents
from mlx_vector_db_spark.operators.rag import format_rag_prompt, retrieve_context
from mlx_vector_db_spark.store import VectorStore

#: an encoder maps a list of texts to an (N, dim) float32 matrix
Encoder = Callable[[list[str]], np.ndarray]


def masked_mean_pool(hidden: np.ndarray, mask: np.ndarray) -> np.ndarray:
    """Attention-masked mean pooling (reference F6,
    integrations/mlx_lm_pipeline.py:81-101): ``sum(h*mask) /
    max(sum(mask), 1e-9)`` over the sequence axis.

    hidden: (batch, seq, dim); mask: (batch, seq) of 0/1.
    """
    m = mask[..., None].astype(np.float64)
    summed = (hidden.astype(np.float64) * m).sum(axis=1)
    counts = np.maximum(m.sum(axis=1), 1e-9)
    return (summed / counts).astype(np.float32)


class HashingEncoder:
    """Feature-hashing text encoder (deterministic, dependency-free).

    token -> bucket = sha1(token) mod dim, signed by one hash bit;
    vector = L2-normalized signed counts. The classic hashing-trick
    embedding — a real (if simple) semantic encoder: texts sharing
    vocabulary get high cosine similarity.
    """

    def __init__(self, dim: int = 128):
        self.dim = int(dim)

    def _token_bucket(self, tok: str) -> tuple[int, float]:
        h = int.from_bytes(hashlib.sha1(tok.encode()).digest()[:8], "big")
        return h % self.dim, 1.0 if (h >> 62) & 1 else -1.0

    def __call__(self, texts: list[str]) -> np.ndarray:
        out = np.zeros((len(texts), self.dim), dtype=np.float64)
        for i, t in enumerate(texts):
            for tok in (t or "").lower().split():
                j, sign = self._token_bucket(tok)
                out[i, j] += sign
        norms = np.maximum(np.linalg.norm(out, axis=1, keepdims=True), 1e-8)
        return (out / norms).astype(np.float32)


class RandomProjectionEncoder:
    """Deterministic model-shaped encoder at sentence-transformer dim.

    Mirrors the reference pipeline's encode stage structurally
    (integrations/mlx_lm_pipeline.py:323-397: tokenize -> per-token
    hidden state -> masked mean-pool -> L2-normalize) with a seeded
    random-projection table standing in for model weights: each token
    hashes to a row of a (n_buckets, dim) Gaussian table, a text is the
    mean of its token rows, normalized. No ML runtime ships in this
    container, but this proves the Arrow-batch mapInPandas contract at
    realistic dim (384/768) — batch shape, schema, worker memory — and
    is still semantically meaningful (shared vocabulary => cosine
    similarity), so retrieval tests stay real.

    The table (~6 MB at 384-dim) is regenerated from the seed lazily in
    each Python worker instead of being pickled into the UDF closure.
    """

    def __init__(self, dim: int = 384, n_buckets: int = 4096, seed: int = 42):
        self.dim = int(dim)
        self.n_buckets = int(n_buckets)
        self.seed = int(seed)
        self._table: np.ndarray | None = None

    def __getstate__(self):  # ship the seed, not the 6 MB table
        return {"dim": self.dim, "n_buckets": self.n_buckets, "seed": self.seed}

    def __setstate__(self, state):
        self.__dict__.update(state)
        self._table = None

    def _tbl(self) -> np.ndarray:
        if self._table is None:
            rng = np.random.default_rng(self.seed)
            self._table = rng.standard_normal(
                (self.n_buckets, self.dim)
            ).astype(np.float32)
        return self._table

    def _bucket(self, tok: str) -> int:
        # memoized per worker: natural text is zipfian, so the sha1 runs
        # ~once per vocab word, not once per token occurrence (the
        # python-side hash dominates encode cost otherwise)
        memo = self.__dict__.setdefault("_bucket_memo", {})
        b = memo.get(tok)
        if b is None:
            b = (
                int.from_bytes(hashlib.sha1(tok.encode()).digest()[:8], "big")
                % self.n_buckets
            )
            if len(memo) >= 1_000_000:  # bound worker memory on huge vocabs
                memo.clear()
            memo[tok] = b
        return b

    def __call__(self, texts: list[str]) -> np.ndarray:
        table = self._tbl()
        out = np.zeros((len(texts), self.dim), dtype=np.float64)
        for i, t in enumerate(texts):
            toks = (t or "").lower().split()
            if not toks:
                continue
            idx = np.fromiter(
                (self._bucket(tok) for tok in toks),
                dtype=np.int64,
                count=len(toks),
            )
            # masked mean pool over the token axis (reference F6 shape)
            out[i] = table[idx].mean(axis=0)
        norms = np.maximum(np.linalg.norm(out, axis=1, keepdims=True), 1e-8)
        return (out / norms).astype(np.float32)


class SentenceTransformerEncoder:
    """Real-model encoder adapter (reference parity for the actual MLX
    model encode stage, integrations/mlx_lm_pipeline.py:247-397): wraps
    any ``sentence-transformers``-compatible model as an
    :data:`Encoder`, so ``embed_texts`` / ``TextPipeline`` run genuine
    384/768-dim embeddings when the library is installed.

    The model is NEVER pickled into the UDF closure: only the model
    name ships to executors, and each Python worker loads the model
    once, lazily, on first batch (the same load-once-per-worker pattern
    as RandomProjectionEncoder's projection table). Construction fails
    fast driver-side when the library is absent — callers that want a
    soft fallback use :func:`default_encoder`.
    """

    def __init__(self, model_name: str = "all-MiniLM-L6-v2", dim: int = 384):
        import importlib.util

        if importlib.util.find_spec("sentence_transformers") is None:
            raise ImportError(
                "sentence-transformers is not installed; use "
                "RandomProjectionEncoder or default_encoder() instead"
            )
        self.model_name = model_name
        self.dim = int(dim)
        self._model = None

    def __getstate__(self):  # ship the name, not the model weights
        return {"model_name": self.model_name, "dim": self.dim}

    def __setstate__(self, state):
        self.__dict__.update(state)
        self._model = None

    def _m(self):
        if self._model is None:
            from sentence_transformers import SentenceTransformer

            self._model = SentenceTransformer(self.model_name)
        return self._model

    def __call__(self, texts: list[str]) -> np.ndarray:
        vecs = self._m().encode(
            texts,
            convert_to_numpy=True,
            normalize_embeddings=True,  # reference L2-normalizes (:394)
            show_progress_bar=False,
        )
        out = np.asarray(vecs, dtype=np.float32)
        if out.ndim != 2 or out.shape[1] != self.dim:
            raise ValueError(
                f"model {self.model_name!r} returned dim {out.shape[-1]}, "
                f"expected {self.dim}"
            )
        return out


def default_encoder(dim: int = 384, model_name: str = "all-MiniLM-L6-v2") -> Encoder:
    """The best encoder available in this environment: a real
    sentence-transformers model when the library is installed, else the
    deterministic model-shaped :class:`RandomProjectionEncoder` (same
    dim, same Arrow/mapInPandas contract)."""
    try:
        return SentenceTransformerEncoder(model_name=model_name, dim=dim)
    except ImportError:
        return RandomProjectionEncoder(dim=dim)


def embed_texts(
    df: DataFrame,
    encoder: Encoder,
    dim: int,
    text_col: str = "chunk_text",
    batch_size: int = 32,
) -> DataFrame:
    """Add an ``embedding array<float>`` column via mapInPandas.

    The encoder sees lists of at most ``batch_size`` texts (the
    reference encodes in batches of 32, :508-562); Arrow moves the
    batches, Python only runs the model call. Output schema = input
    columns + embedding — downstream store append works unchanged.
    """
    fields = df.schema.fields
    out_schema = ", ".join(
        [f"{f.name} {f.dataType.simpleString()}" for f in fields]
        + ["embedding array<float>"]
    )

    def run(batches):
        # Arrow-native batch assembly (guide §4.2): the previous
        # mapInPandas form emitted the vectors as per-row Python lists
        # (``v.tolist()``), paying one Python float object per
        # dimension per row on the way back to Arrow — at 384-dim that
        # conversion dominated the encode stage. Here the (n, dim)
        # float32 matrix becomes ONE ListArray over its flat buffer;
        # values are bit-identical (float32 either way).
        import pyarrow as pa

        for rb in batches:
            if rb.num_rows == 0:
                continue
            texts = [
                "" if t is None else t
                for t in rb.column(rb.schema.get_field_index(text_col)).to_pylist()
            ]
            vecs: list[np.ndarray] = []
            for i in range(0, len(texts), batch_size):
                vecs.append(encoder(texts[i : i + batch_size]))
            emb = np.ascontiguousarray(np.vstack(vecs), dtype=np.float32)
            if emb.shape != (len(texts), dim):
                raise ValueError(
                    f"encoder returned {emb.shape}, expected ({len(texts)}, {dim})"
                )
            # int32 list offsets cap one batch at 2^31 flat floats;
            # guard explicitly instead of silently wrapping (reachable
            # only with an extreme arrow.maxRecordsPerBatch x dim —
            # ADVICE r13)
            if (len(texts) + 1) * dim >= (1 << 31):
                raise ValueError(
                    f"embedding batch of {len(texts)} rows x {dim} dims "
                    "overflows int32 Arrow list offsets; lower "
                    "spark.sql.execution.arrow.maxRecordsPerBatch"
                )
            offsets = pa.array(
                np.arange(0, (len(texts) + 1) * dim, dim, dtype=np.int32)
            )
            flat = pa.array(emb.reshape(-1))
            col = pa.ListArray.from_arrays(offsets, flat)
            # RecordBatch.from_arrays instead of append_column: the
            # latter exists only on pyarrow >= 15 and pyproject declares
            # an unpinned pyarrow (ADVICE r13)
            yield pa.RecordBatch.from_arrays(
                [rb.column(i) for i in range(rb.num_columns)] + [col],
                names=list(rb.schema.names) + ["embedding"],
            )

    return df.mapInArrow(run, schema=out_schema)


class TextPipeline:
    """End-to-end document indexing + retrieval over a VectorStore
    (reference MLXLMPipeline surface)."""

    def __init__(
        self,
        store: VectorStore,
        encoder: Encoder | None = None,
    ):
        self.store = store
        self.encoder = encoder or HashingEncoder(store.config.dimension)
        self.dim = store.config.dimension

    def index_documents(
        self,
        docs: DataFrame,
        chunk_size: int = 400,
        overlap: int = 50,
        text_col: str = "text",
        id_col: str = "doc_id",
        source_col: str | None = "source",
    ) -> int:
        """documents -> chunks -> embeddings -> store append. Returns the
        number of chunks indexed (reference returns the same counters,
        :687-694)."""
        chunks = chunk_documents(
            docs, chunk_size=chunk_size, overlap=overlap,
            text_col=text_col, id_col=id_col,
        )
        if source_col and source_col in docs.columns:
            src = docs.select(
                F.col(id_col).alias("document_id"),
                F.col(source_col).alias("document_source"),
            )
            chunks = chunks.join(src, on="document_id", how="left")
        embedded = embed_texts(chunks, self.encoder, self.dim)
        # the append validates (one agg) then writes: persist so the
        # chunk+encode stages run once, not once per pass — the encode is
        # the expensive stage by construction (it's the model call)
        embedded = embedded.persist()
        try:
            return self.store.add_vectors(embedded)
        finally:
            embedded.unpersist()

    def search_similar_texts(
        self, query: str, k: int = 10, **query_kwargs
    ) -> DataFrame:
        """Embed the query driver-side (one string) and run the store's
        §3.1 search path."""
        qvec = self.encoder([query])[0].tolist()
        return self.store.query(qvec, k=k, **query_kwargs)

    def retrieve_context(
        self,
        query: str,
        k: int = 5,
        min_similarity: float = 0.7,
        max_context_length: int = 2000,
    ) -> DataFrame:
        """Reference retrieve_context semantics (over-fetch 2k,
        threshold, greedy skip-pack) over the store's chunk table."""
        qvec = self.encoder([query])[0].tolist()
        return retrieve_context(
            self.store.to_df(),
            qvec,
            k=k,
            min_similarity=min_similarity,
            max_context_length=max_context_length,
            metric=self.store.config.metric,
            norm_col="norm",
        )

    def answer_prompt(self, query: str, **kwargs) -> str:
        """retrieve + format (reference format_rag_prompt, :767-791)."""
        ctx = self.retrieve_context(query, **kwargs).orderBy("context_rank").collect()
        return format_rag_prompt(
            ctx, query, text_col="chunk_text", source_col="document_source"
        )
