"""Connected components over candidate-pair edges (dedup clustering).

After MinHash-LSH/SimHash produce near-duplicate *pairs*, deduplication needs
*clusters* (keep one doc per component). This is the alternating-algorithm
(large-star / small-star, Kiveris et al.) expressed in DataFrame ops:

    state:  label(v) = current minimum-known component id per vertex
    step:   propagate min(label) across edges both ways, join back, iterate
    stop:   no label changed (count of updates == 0)

Scale properties: every iteration is two shuffles (groupBy min + join) on
uniform vertex-id keys; convergence is O(log(diameter)) iterations for the
path-like components near-dup graphs produce. ``localCheckpoint`` truncates
the lineage each round so plans don't grow exponentially (the classic
iterative-Spark trap).

Not SQL-expressible in one query (DuckDB's RECURSIVE could do it, but the
driver contract's hash compare needs deterministic output anyway — component
ids are min doc ids, which ARE deterministic; the rows-only check plus unit
tests cover it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    *,
    src: str = "id_a",
    dst: str = "id_b",
    max_iterations: int = 20,
) -> DataFrame:
    """Return (id, component) where component = min vertex id in the
    component. Edges are undirected; isolated vertices don't appear (join
    the corpus afterwards with a coalesce(component, id) for those).
    """
    e = edges.select(
        F.col(src).cast("long").alias("src"), F.col(dst).cast("long").alias("dst")
    )
    # undirected → both directions once
    sym = e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    sym = sym.filter(F.col("src") != F.col("dst")).distinct().localCheckpoint()

    labels = (
        sym.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("component", F.col("id"))
    )

    for _ in range(max_iterations):
        # candidate label per vertex: min over neighbors' labels and own
        neighbor_min = (
            sym.join(labels, sym.dst == labels.id)
            .groupBy("src")
            .agg(F.min("component").alias("neighbor_component"))
        )
        updated = (
            labels.join(neighbor_min, labels.id == neighbor_min.src, "left")
            .select(
                "id",
                F.least(
                    F.col("component"),
                    F.coalesce(F.col("neighbor_component"), F.col("component")),
                ).alias("new_component"),
                "component",
            )
        )
        n_changed = updated.filter(
            F.col("new_component") != F.col("component")
        ).count()
        labels = updated.select(
            "id", F.col("new_component").alias("component")
        ).localCheckpoint()  # truncate lineage every round
        if n_changed == 0:
            break
    return labels


def dedup_clusters(
    docs: DataFrame,
    candidate_pairs: DataFrame,
    *,
    id_col: str = "doc_id",
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """Full-corpus cluster assignment: every doc gets a cluster id (its own
    id when it has no near-duplicates) plus a keep/drop flag (keep = the
    minimum id in the cluster)."""
    comp = connected_components(candidate_pairs, src=src, dst=dst)
    out = docs.select(F.col(id_col)).join(
        comp, docs[id_col] == comp.id, "left"
    )
    return out.select(
        F.col(id_col),
        F.coalesce(F.col("component"), F.col(id_col)).alias("cluster_id"),
    ).withColumn("keep", F.col(id_col) == F.col("cluster_id"))
