"""Blocked fuzzy matching — edit-distance record linkage at scale.

The data-cleaning staple for catalog/entity corpora: find row pairs
whose text differs by at most ``max_distance`` edits (typos, OCR noise,
near-identical product names). All-pairs edit distance is O(N²·L²) and
never runs at corpus scale; the standard shape is **blocking**:

1. candidates only meet inside a block (same brand, same first token,
   same soundex, ...) — the self-join's shuffle key is the block, so
   cost is Σ block² not N²;
2. a cheap length-difference prune runs before the quadratic
   ``levenshtein`` (|len(a)-len(b)| is a lower bound on edit distance),
   inside whole-stage codegen;
3. the exact distance refines the survivors only.

Both stages are JVM built-ins (``F.levenshtein``) — no Python workers.
Same layering as the near-dup family (operators/dedup.py): bucketed
candidate generation + exact verify on candidates only.

Scale ceiling, stated honestly: within a block the cost is still
quadratic, so this operator is for blocking schemes whose block sizes
stay bounded as the corpus grows (entity keys, catalog brands × name
prefixes, per-source buckets). When blocks grow with N, the next tier
is :func:`lsh_fuzzy_pairs`: MinHash/LSH over character shingles as the
candidate generator and the same exact levenshtein as the verify — the
same audit-oracle vs scale-path layering as ``embedding_neardup`` vs
``embedding_neardup_bucketed``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["fuzzy_pairs", "blocked_fuzzy_pairs", "lsh_fuzzy_pairs"]


def fuzzy_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    max_distance: int = 2,
    block_cols: list[str] | str | None = None,
    **lsh_knobs,
) -> DataFrame:
    """Tier dispatcher for fuzzy matching — one entry point, the recall
    knobs of both tiers exposed uniformly.

    With ``block_cols``: :func:`blocked_fuzzy_pairs` (exact within the
    block, quadratic per block — bounded-block schemes only; recall is
    limited by the blocking choice). Without: :func:`lsh_fuzzy_pairs`
    (char-shingle MinHash candidates + exact levenshtein verify; recall
    is controlled by the LSH knobs, precision stays exact). Both emit
    ``id_a, id_b, distance`` with ``id_a < id_b`` and
    ``distance <= max_distance``, so callers can switch tiers without
    touching downstream code.

    ``**lsh_knobs`` (``num_hashes``, ``bands``, ``shingle_n``,
    ``jaccard_floor``, ``max_bucket_size``) forward to the LSH tier and
    are rejected when a blocking column is given — a silent ignore
    would mask a mis-tiered call.
    """
    if block_cols is not None:
        if lsh_knobs:
            raise ValueError(
                f"LSH knobs {sorted(lsh_knobs)} have no effect on the "
                "blocked tier; drop block_cols to use LSH candidates"
            )
        return blocked_fuzzy_pairs(
            df, text_col, id_col, block_cols, max_distance=max_distance
        )
    return lsh_fuzzy_pairs(
        df, text_col, id_col, max_distance=max_distance, **lsh_knobs
    )


def blocked_fuzzy_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    block_cols: list[str] | str,
    max_distance: int = 2,
) -> DataFrame:
    """Pairs ``(id_a, id_b, distance)`` with ``id_a < id_b``, same block
    values, and ``levenshtein(text_a, text_b) <= max_distance``.

    Recall caveat (standard for blocking): pairs that differ in a
    BLOCKING column are never compared — choose blocks that near-dups
    can't disagree on, or union several blocking passes.
    """
    if max_distance < 0:
        raise ValueError(f"max_distance must be >= 0, got {max_distance}")
    blocks = [block_cols] if isinstance(block_cols, str) else list(block_cols)
    if not blocks:
        raise ValueError("at least one blocking column is required")
    a = df.select(
        *blocks,
        F.col(id_col).alias("id_a"),
        F.col(text_col).alias("_ta"),
    )
    b = df.select(
        *blocks,
        F.col(id_col).alias("id_b"),
        F.col(text_col).alias("_tb"),
    )
    return (
        a.join(b, on=blocks)
        .where(F.col("id_a") < F.col("id_b"))
        # length-difference lower bound: prunes most of the block's
        # quadratic fan-out before the O(L²) edit distance runs
        .where(
            F.abs(F.length("_ta") - F.length("_tb")) <= F.lit(max_distance)
        )
        .withColumn("distance", F.levenshtein("_ta", "_tb"))
        .where(F.col("distance") <= F.lit(max_distance))
        .select("id_a", "id_b", "distance")
    )


def lsh_fuzzy_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    max_distance: int = 2,
    num_hashes: int = 64,
    bands: int = 32,
    shingle_n: int = 3,
    jaccard_floor: float = 0.2,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Fuzzy matching WITHOUT a blocking column — the scale tier past
    :func:`blocked_fuzzy_pairs`' quadratic-within-block ceiling.

    Candidate generation is MinHash-LSH over CHARACTER ``shingle_n``-grams
    (each char becomes a token via a regexp projection, then the standard
    banded pipeline from operators/dedup.py runs unchanged — one explode,
    K min-aggs, self-join keyed on (band, band_hash), never all-pairs);
    the verify is the exact JVM ``levenshtein`` on the RAW text, so
    emitted pairs are exact — LSH can only cost recall, never precision.

    Defaults are tuned for short edit-distance strings: ``bands=32`` of 2
    rows each keeps per-band match probability high at the modest char
    n-gram Jaccard a ``max_distance``-edit pair of a short string has
    (each edit destroys at most ``shingle_n`` of its ``L`` shingles), and
    ``jaccard_floor`` is a permissive candidate filter — the edit
    distance, not Jaccard, is the accept test. Whitespace runs are
    dropped by tokenization before shingling, so candidates are
    space-insensitive; the exact verify is not.

    Output: ``id_a, id_b, distance`` (<= max_distance), a subset of the
    all-pairs truth with recall controlled by (num_hashes, bands).
    """
    if max_distance < 0:
        raise ValueError(f"max_distance must be >= 0, got {max_distance}")
    from mlx_vector_db_spark.operators.dedup import minhash_lsh_pairs

    # every character its own whitespace-separated token: token n-grams
    # downstream are then character n-grams
    chars = F.regexp_replace(F.col(text_col), "(.)", "$1 ")
    base = df.select(F.col(id_col).alias("_fid"), chars.alias("_chars"))
    cand = minhash_lsh_pairs(
        base,
        text_col="_chars",
        id_col="_fid",
        num_hashes=num_hashes,
        bands=bands,
        shingle_n=shingle_n,
        threshold=jaccard_floor,
        max_bucket_size=max_bucket_size,
    ).select("id_a", "id_b")
    texts = df.select(F.col(id_col).alias("_tid"), F.col(text_col).alias("_t"))
    return (
        cand.join(texts.select(F.col("_tid").alias("id_a"), F.col("_t").alias("_ta")), on="id_a")
        .join(texts.select(F.col("_tid").alias("id_b"), F.col("_t").alias("_tb")), on="id_b")
        .where(F.abs(F.length("_ta") - F.length("_tb")) <= F.lit(max_distance))
        .withColumn("distance", F.levenshtein("_ta", "_tb"))
        .where(F.col("distance") <= F.lit(max_distance))
        .select("id_a", "id_b", "distance")
    )
