"""Drop-in client facade matching the reference SDK's surface.

The reference ships ``MLXVectorDBClient`` (sdk/python/
mlx_vector_db_client.py:65-321): async methods ``create_store /
delete_store / get_store_stats / add_vectors / query / batch_query /
count_vectors / delete_vectors_by_metadata / health_check`` returning
``QueryResponseSDK``/``StoreStatsSDK`` dataclasses. A user of that SDK
can switch to this engine by swapping the import: same method names,
same call shapes, same result dataclasses — but the calls drive the
Spark engine directly instead of a REST server (so they are plain sync
methods; the reference is async only because it wraps HTTP).

Notably, ``delete_vectors_by_metadata`` *works* here — the reference SDK
calls ``POST /vectors/delete``, an endpoint the server never implemented
(SURVEY.md §2.11).
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import SparkSession

from mlx_vector_db_spark.store import VectorStoreCatalog


@dataclass
class QueryResultItem:
    """Mirror of QueryResultItemSDK (sdk client :40-45)."""

    id: int | None = None
    distance: float | None = None
    similarity_score: float | None = None
    metadata: dict[str, Any] = field(default_factory=dict)
    rank: int | None = None


@dataclass
class QueryResponse:
    """Mirror of QueryResponseSDK (sdk client :47-50)."""

    results: list[QueryResultItem]


@dataclass
class StoreStats:
    """Mirror of StoreStatsSDK (sdk client :53-56), extended with the
    engine's fuller stats dict."""

    vectors: int
    metadata: int
    detail: dict[str, Any] = field(default_factory=dict)


class VectorDBClient:
    """Reference-SDK-compatible facade over the Spark engine."""

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        default_dimension: int = 384,
        default_metric: str = "cosine",
    ):
        self.catalog = VectorStoreCatalog(spark, root)
        self.default_dimension = default_dimension
        self.default_metric = default_metric

    # -- store lifecycle (sdk :111-131) ------------------------------------

    def create_store(
        self,
        user_id: str,
        model_id: str,
        dimension: int | None = None,
        metric: str | None = None,
        **kwargs,
    ) -> dict[str, Any]:
        self.catalog.create_store(
            user_id,
            model_id,
            dimension=dimension or self.default_dimension,
            metric=metric or self.default_metric,
            **kwargs,
        )
        return {"status": "created", "user_id": user_id, "model_id": model_id}

    def delete_store(self, user_id: str, model_id: str) -> dict[str, Any]:
        self.catalog.delete_store(user_id, model_id)
        return {"status": "deleted", "user_id": user_id, "model_id": model_id}

    def store_exists(self, user_id: str, model_id: str) -> bool:
        return self.catalog.store_exists(user_id, model_id)

    # -- data plane --------------------------------------------------------

    def add_vectors(
        self,
        user_id: str,
        model_id: str,
        vectors: Sequence[Sequence[float]],
        metadata: Sequence[Mapping[str, Any]] | None = None,
    ) -> dict[str, Any]:
        """sdk :145-169; returns the add-count payload the REST route
        produced (api/routes/vectors.py:196-203)."""
        store = self.catalog.get_store(user_id, model_id)
        n = store.add_vectors(vectors, metadata)
        return {"status": "success", "vectors_added": n}

    def upsert_vectors(
        self,
        user_id: str,
        model_id: str,
        vectors: Sequence[Sequence[float]],
        ids: Sequence[int],
        metadata: Sequence[Mapping[str, Any]] | None = None,
    ) -> dict[str, Any]:
        """Merge-by-id (no reference analog — its mutation surface stops
        at append; see VectorStore.upsert_vectors)."""
        store = self.catalog.get_store(user_id, model_id)
        updated, inserted = store.upsert_vectors(vectors, metadata, ids=ids)
        return {
            "status": "success",
            "vectors_updated": updated,
            "vectors_inserted": inserted,
        }

    def query(
        self,
        user_id: str,
        model_id: str,
        query_vector: Sequence[float],
        k: int = 10,
        filter_metadata: Mapping[str, Any] | None = None,
    ) -> QueryResponse:
        """sdk :171-207 — same per-item fields the REST response carried
        (metadata + similarity_score + distance + rank,
        api/routes/vectors.py:253-258)."""
        store = self.catalog.get_store(user_id, model_id)
        rows = store.query(
            list(query_vector), k=k, filter_metadata=filter_metadata
        ).collect()
        engine_cols = {
            "embedding", "norm", "score", "similarity", "distance",
            "rank", "centroid_id",
        }
        meta_cols = (
            [c for c in rows[0].__fields__ if c not in engine_cols] if rows else []
        )
        return QueryResponse(
            results=[
                QueryResultItem(
                    id=r["id"],
                    distance=r["distance"],
                    similarity_score=r["similarity"],
                    rank=r["rank"],
                    metadata={
                        **{c: r[c] for c in meta_cols if c != "meta"},
                        **(r["meta"] or {}),
                    },
                )
                for r in rows
            ]
        )

    def batch_query(
        self,
        user_id: str,
        model_id: str,
        query_vectors: Sequence[Sequence[float]],
        k: int = 10,
        filter_metadata: Mapping[str, Any] | None = None,
    ) -> list[QueryResponse]:
        """sdk :209-260 — the method whose server side never existed
        (store.batch_query was called but undefined, SURVEY.md §2.11);
        here it runs the batch join operator."""
        store = self.catalog.get_store(user_id, model_id)
        spark = self.catalog.spark
        qdf = spark.createDataFrame(
            [(i, [float(x) for x in v]) for i, v in enumerate(query_vectors)],
            "query_id long, embedding array<float>",
        )
        rows = store.batch_query(qdf, k=k, filter_metadata=filter_metadata).collect()
        by_q: dict[int, list] = {i: [] for i in range(len(query_vectors))}
        for r in rows:
            by_q[r["query_id"]].append(r)
        out = []
        for i in range(len(query_vectors)):
            items = sorted(by_q[i], key=lambda r: r["rank"])
            out.append(
                QueryResponse(
                    results=[
                        QueryResultItem(
                            id=r["id"],
                            distance=r["distance"],
                            similarity_score=r["similarity"],
                            rank=r["rank"],
                        )
                        for r in items
                    ]
                )
            )
        return out

    def count_vectors(self, user_id: str, model_id: str) -> StoreStats:
        """sdk :281-290."""
        store = self.catalog.get_store(user_id, model_id)
        n = store.count()
        return StoreStats(vectors=n, metadata=n)

    def get_store_stats(self, user_id: str, model_id: str) -> StoreStats:
        """sdk :132-143."""
        store = self.catalog.get_store(user_id, model_id)
        s = store.stats()
        return StoreStats(
            vectors=s["vector_count"], metadata=s["vector_count"], detail=s
        )

    def delete_vectors_by_metadata(
        self, user_id: str, model_id: str, filter_metadata: Mapping[str, Any]
    ) -> int:
        """sdk :292-303 — implemented for real (the reference server had
        no such endpoint)."""
        store = self.catalog.get_store(user_id, model_id)
        return store.delete_vectors(filter_metadata=filter_metadata)

    def health_check(self) -> dict[str, Any]:
        """sdk :306-309."""
        try:
            self.catalog.spark.range(1).count()
            return {"status": "healthy", "stores": len(self.catalog.list_stores())}
        except Exception as exc:  # pragma: no cover - defensive
            return {"status": "unhealthy", "detail": str(exc)}
