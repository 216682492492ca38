"""Connected components over a near-duplicate pair graph.

Near-dup pair lists (MinHash/SimHash/embedding cosine) only relate
*pairs*; real corpus dedup needs transitive clusters — if A~B and B~C,
all three are one group and one keeper survives (SURVEY.md §7.3's
"semantic dedup via connected components"). The greedy pairwise drop in
``minhash_dedup`` can over-delete vs the cluster rule; this operator
computes exact components.

Algorithm: iterative min-label propagation ("hash-to-min" style) — each
node starts labeled with itself; every round, each node adopts the
minimum label in its neighborhood; stop when no label changes. Rounds
needed = graph diameter, which for near-dup graphs is tiny (dup clusters
are cliques or short chains), so the loop converges in 2-4 shuffles.
Each round is one groupBy-min plus a join — all shuffle keys are node
ids, no driver-side graph ever materializes, so the pattern holds at
billions of edges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["connected_components", "dedup_keepers", "component_safe_split"]


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iterations: int = 20,
) -> DataFrame:
    """(node, component) for every node that appears in ``pairs``, where
    ``component`` is the minimum node id reachable from it.

    Deterministic; isolated nodes (not in any pair) are simply absent —
    callers treat missing as "its own component".
    """
    edges = (
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .union(pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst")))
        .distinct()
    )
    # edges join into EVERY propagation round: checkpoint once so the
    # (possibly expensive) pair-generation lineage — a MinHash banding
    # pipeline, say — runs once, not once per round
    edges = edges.localCheckpoint(eager=True)
    # initial label: the node's own id and every neighbor's id, collapsed
    labels = (
        edges.groupBy("src")
        .agg(F.least(F.min("dst"), F.first("src")).alias("component"))
        .select(F.col("src").alias("node"), "component")
    )
    labels = labels.localCheckpoint(eager=True)

    for _ in range(max_iterations):
        # each node proposes its current label to every neighbor
        proposals = (
            edges.join(labels, edges.src == labels.node)
            .select(F.col("dst").alias("node"), "component")
            .union(labels)
        )
        new_labels = proposals.groupBy("node").agg(
            F.min("component").alias("component")
        )
        new_labels = new_labels.localCheckpoint(eager=True)
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), on="node")
            .where(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels


def dedup_keepers(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus filtered to one keeper (min id) per near-dup component.

    Unlike the greedy pairwise rule, transitive chains collapse to one
    survivor: A~B, B~C => only A remains even though A!~C directly.
    """
    comp = connected_components(pairs)
    doomed = comp.where(F.col("node") != F.col("component")).select(
        F.col("node").alias(id_col)
    )
    return df.join(doomed, on=id_col, how="left_anti")


def component_safe_split(
    df: DataFrame,
    pairs: DataFrame,
    fractions: dict[str, float] | None = None,
    id_col: str = "doc_id",
    salt: str = "split",
) -> DataFrame:
    """Leakage-safe train/val/test assignment: split by near-duplicate
    COMPONENT, never by document, so a near-dup pair can never straddle
    train and eval — the standard held-out-set hygiene that plain
    hash-of-id splitting silently violates (a test document's duplicate
    in train is memorized contamination that n-gram decontamination
    only catches after the fact).

    ``pairs`` is any near-dup pair frame (``id_a``/``id_b`` — MinHash,
    SimHash, embedding cosine, exact-fingerprint...). All members of a
    connected component share the component representative's md5 draw,
    hence its split; documents in no pair draw on their own id.

    ``fractions`` maps split name to its probability mass, in the
    order given (default ``{"train": .9, "val": .05, "test": .05}``);
    must sum to 1 within 1e-9. The draw is
    :func:`~mlx_vector_db_spark.operators.sampling.sample_key` of the
    component id — deterministic across engines, cluster sizes and
    retries, and expressible as a SQL oracle. Per-split mass holds in
    expectation at the COMPONENT level (components are the atomic
    units; a giant dup family lands in exactly one split by design).

    Returns ``df`` + ``(component, split)``.

    Scale: components are the iterative min-label propagation above
    (node-keyed shuffles only); the assignment itself is one left join
    of the corpus against the component map plus a pure expression —
    no extra shuffle beyond that join.
    """
    from mlx_vector_db_spark.operators.sampling import sample_key

    if fractions is None:
        fractions = {"train": 0.9, "val": 0.05, "test": 0.05}
    if not fractions:
        raise ValueError("fractions must be non-empty")
    for name, frac in fractions.items():
        if not 0.0 <= float(frac) <= 1.0:
            raise ValueError(f"fraction for {name!r} must be in [0, 1] (got {frac})")
    total = sum(float(v) for v in fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1 (got {total})")

    comp = connected_components(pairs).withColumnRenamed("node", id_col)
    out = df.join(comp, on=id_col, how="left").withColumn(
        "component", F.coalesce(F.col("component"), F.col(id_col))
    )
    key = sample_key("component", salt)
    cum = 0.0
    expr = None
    names = list(fractions)
    for name in names[:-1]:
        cum += float(fractions[name])
        cond = key < F.lit(cum)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = F.lit(names[-1])
    expr = last if expr is None else expr.otherwise(last)
    return out.withColumn("split", expr)
