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
is MinHash/LSH over character shingles (operators/dedup.py
``minhash_lsh_pairs`` with ``shingle_n`` on chars) as the candidate
generator and this operator's exact levenshtein as the verify — the
same audit-oracle vs scale-path layering as ``embedding_neardup`` vs
``embedding_neardup_bucketed``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["blocked_fuzzy_pairs"]


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
