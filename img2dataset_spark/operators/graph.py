"""Connected components over an edge list — the cluster step of
near-duplicate deduplication.

LSH pair generation (operators/dedup.py, operators/similarity.py) emits
EDGES; to actually dedup a corpus you need the transitive closure —
connected components — so each near-dup cluster keeps exactly one
representative.  Spark has no built-in CC, so this implements
iterative min-label propagation as pure DataFrame ops:

  label(v) <- min(label(v), min over neighbors' labels)

repeated until a fixpoint.  Per round: one join (labels onto edge
endpoints) + one min-aggregation — two hash shuffles, both keyed on
node id, plus an O(1)-row convergence check.  Rounds needed = graph
diameter; near-dup clusters are dense and shallow (diameter ≲ 3-4 in
practice), so this converges in a handful of rounds.  For adversarial
long-chain graphs at 100 TB you'd switch to the large-star/small-star
algorithm (Kiveris et al., "Connected Components in MapReduce and
Beyond", SoCC'14) whose round count is O(log n) regardless of
diameter; the per-round plan shape is identical, so the swap is local.

Lineage is truncated every round with an eager localCheckpoint —
without it each iteration's plan would embed all previous ones and
re-execute the whole history per action (and overflow the planner at
depth).  On a real cluster use a reliable checkpoint dir instead
(localCheckpoint does not survive executor loss).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """(node, component) for every node appearing in ``edges``, where
    ``component`` is the smallest node id reachable from the node
    (including itself).  Raises if not converged after ``max_iter``
    rounds (diameter-bound exceeded — see module docstring)."""
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .localCheckpoint()
    )
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        neighbor_min = (
            sym.join(labels, sym.b == labels.node)
            .groupBy("a")
            .agg(F.min("label").alias("nmin"))
            .withColumnRenamed("a", "node")
        )
        new_labels = (
            labels.join(neighbor_min, "node", "left")
            .select(
                "node",
                F.least("label", F.coalesce("nmin", "label")).alias("label"),
                (F.col("nmin") < F.col("label")).alias("_changed"),
            )
        ).localCheckpoint()
        changed = new_labels.filter(F.col("_changed")).limit(1).count()
        labels = new_labels.drop("_changed")
        if changed == 0:
            return labels.select("node", F.col("label").alias("component"))
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds; "
        "use the large-star/small-star variant for long-chain graphs"
    )


def dedup_representatives(
    df: DataFrame,
    components: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep one row per near-dup cluster: the component representative
    (min id) survives, other members drop; rows not in any component
    (singletons — never emitted as an edge endpoint) all survive.
    Anti-join against the non-representative member set, which is tiny
    relative to the corpus, so it broadcasts."""
    dupes = components.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias(id_col)
    )
    return df.join(F.broadcast(dupes), id_col, "left_anti")
