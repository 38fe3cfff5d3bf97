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
practice), so this converges in a handful of rounds.

For adversarial long-chain graphs at 100 TB,
:func:`connected_components_two_phase` implements the
large-star/small-star algorithm (Kiveris et al., "Connected
Components in MapReduce and Beyond", SoCC'14), whose round count is
O(log² n) — and O(log n) in practice — regardless of diameter.  Each
round is the same shuffle shape (a groupBy-min plus a join keyed on
node id), but the edge set itself is rewritten toward a star forest
instead of propagating labels over a fixed topology, which is what
removes the diameter dependence.

Lineage is truncated every round with an eager checkpoint — without
it each iteration's plan would embed all previous ones and re-execute
the whole history per action (and overflow the planner at depth).
Locally that is `localCheckpoint()` (executor memory/disk); on a real
cluster pass ``checkpoint_dir=`` to both CC functions to use a
RELIABLE `df.checkpoint()` into HDFS/object storage instead —
localCheckpoint blocks are lost with their executor, which on a
1000-executor preemptible fleet means a dead job mid-iteration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _truncate(df: DataFrame, checkpoint_dir: str | None) -> DataFrame:
    """Eager lineage truncation: reliable checkpoint when a dir is given
    (survives executor loss), localCheckpoint otherwise (local mode)."""
    if checkpoint_dir is not None:
        sc = df.sparkSession.sparkContext
        # setCheckpointDir stores a qualified path (scheme + per-context
        # UUID subdir), so the requested dir can't be compared against
        # getCheckpointDir() directly; remember what WE set to avoid
        # both re-mkdir-ing a fresh UUID dir every round and silently
        # keeping a previously-set different directory
        if getattr(sc, "_graft_checkpoint_dir", None) != checkpoint_dir:
            sc.setCheckpointDir(checkpoint_dir)
            sc._graft_checkpoint_dir = checkpoint_dir
        return df.checkpoint(eager=True)
    return df.localCheckpoint()


def _symmetrize_edges(edges: DataFrame, src: str, dst: str, checkpoint_dir):
    # both directions from ONE pass over the edge subtree: a UNION of
    # two selects would reference `edges` twice, and upstream edge
    # producers are expensive (LSH pair generation with exact-Jaccard
    # verify) — measured at the 100x point, the double execution was
    # the entire gap between dedup_components (242s) and pair
    # generation alone (60s).  explode(array(fwd, rev)) scans once.
    return _truncate(
        edges.select(
            F.explode(
                F.array(
                    F.struct(F.col(src).alias("a"), F.col(dst).alias("b")),
                    F.struct(F.col(dst).alias("a"), F.col(src).alias("b")),
                )
            ).alias("_e")
        )
        .select("_e.a", "_e.b")
        .distinct(),
        checkpoint_dir,
    )


def _initial_labels(sym: DataFrame, checkpoint_dir):
    return _truncate(
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("label", F.col("node")),
        checkpoint_dir,
    )


def _symmetrize(edges: DataFrame, src: str, dst: str, checkpoint_dir):
    sym = _symmetrize_edges(edges, src, dst, checkpoint_dir)
    return sym, _initial_labels(sym, checkpoint_dir)


# Driver-local ceiling for connected_components_auto (r14): a
# symmetrized edge list at or under this row count is collected once
# (bounded: 2 ids/row — ~2 MB of longs at the ceiling) and closed with
# an exact union-find, because at this size EVERY distributed round
# costs more than the whole graph does — each label-propagation round
# is a join + aggregation + eager lineage-truncation job plus a
# convergence-probe job (~1 s of fixed cost locally, several scheduler
# round-trips on a cluster) while the data is a few MB.  Past the
# ceiling nothing is collected and the round-budgeted hybrid runs
# unchanged; the gate itself reads a count off the already-materialized
# (localCheckpoint'd) frame, so the distributed path pays one cheap
# cached-scan job, never a second pass over the edge subtree.  Same
# pattern as similarity.FLAT_CODEBOOK_MAX_CELLS: exact driver-local
# small-side fast path under a named bound, distributed algorithm past
# it.
LOCAL_CC_MAX_EDGES = 1 << 17


def _local_components_frame(sym: DataFrame) -> DataFrame:
    """Exact min-id connected components of a BOUNDED symmetrized edge
    frame, computed on the driver with path-compressing union-find and
    returned as a (node, component) literal frame.  Output contract is
    identical to the distributed variants: every edge endpoint appears
    once, component = smallest reachable node id (union-find closes the
    same transitive reachability min-label propagation converges to —
    pinned against both distributed algorithms in test_graph)."""
    rows = sym.collect()  # bounded by LOCAL_CC_MAX_EDGES
    parent: dict = {}

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    for r in rows:
        a, b = r["a"], r["b"]
        if a not in parent:
            parent[a] = a
        if b not in parent:
            parent[b] = b
        ra, rb = find(a), find(b)
        if ra != rb:
            # link larger root under smaller: roots stay the min of
            # their tree, so find() lands on the component min directly
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra
    out = sorted((node, find(node)) for node in parent)
    from pyspark.sql.types import StructField, StructType

    atype = sym.schema["a"].dataType
    schema = StructType(
        [
            StructField("node", atype, False),
            StructField("component", atype, False),
        ]
    )
    return sym.sparkSession.createDataFrame(out, schema)


def _label_prop(
    sym: DataFrame,
    labels: DataFrame,
    max_rounds: int,
    checkpoint_dir: str | None,
) -> tuple[DataFrame, bool]:
    """FRONTIER min-label propagation: a node can only learn a smaller
    label from a neighbor whose label just changed, so each round joins
    the edge set against the DELTA (labels changed last round), not the
    full label frame.  Round 1's delta is everything (initial labels
    must be offered once); after that the frontier shrinks fast — for
    the dense shallow clusters near-dup dedup produces, rounds 2+ touch
    a small fraction of edges, turning the rounds × full-edge-shuffle
    product SCALE.md §2 measured into ~one full round plus small tails.
    AQE broadcasts the (small) delta, so the edge scan stays in place
    and the groupBy shuffle covers only frontier-adjacent rows.

    Correctness: inductively, every label value a neighbor ever held is
    offered to each of its neighbors in the round after adoption (round
    1 for initial labels), so min over offers = min over the neighbor's
    label history — the same fixpoint as joining full labels per round.

    Returns (labels, converged)."""
    delta = labels
    for _ in range(max_rounds):
        neighbor_min = (
            sym.join(
                delta.select(F.col("node").alias("_dn"), "label"),
                sym.b == F.col("_dn"),
            )
            .groupBy("a")
            .agg(F.min("label").alias("nmin"))
            .withColumnRenamed("a", "node")
        )
        new_labels = _truncate(
            labels.join(neighbor_min, "node", "left").select(
                "node",
                F.least("label", F.coalesce("nmin", "label")).alias("label"),
                (F.col("nmin") < F.col("label")).alias("_changed"),
            ),
            checkpoint_dir,
        )
        delta = new_labels.filter(F.col("_changed")).drop("_changed")
        labels = new_labels.drop("_changed")
        if delta.limit(1).count() == 0:
            return labels, True
    return labels, False


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 25,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """(node, component) for every node appearing in ``edges``, where
    ``component`` is the smallest node id reachable from the node
    (including itself).  Raises if not converged after ``max_iter``
    rounds (diameter-bound exceeded — see module docstring; prefer
    :func:`connected_components_auto`, which hands long-diameter
    graphs to the two-phase variant instead of failing)."""
    sym, labels = _symmetrize(edges, src, dst, checkpoint_dir)
    labels, converged = _label_prop(sym, labels, max_iter, checkpoint_dir)
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds; "
            "use connected_components_auto or the large-star/small-star "
            "variant for long-chain graphs"
        )
    return labels.select("node", F.col("label").alias("component"))


def connected_components_auto(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    lp_rounds: int = 12,
    max_iter: int = 50,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Round-budgeted hybrid CC — the variant compositions should call.

    Near-dup graphs are dense and shallow: frontier label propagation
    converges in a handful of rounds and each round is one broadcast
    join + one (frontier-sized) aggregation — cheaper per round than
    the two-phase edge rewrites.  Adversarial long-chain graphs instead
    need the diameter-independent two-phase algorithm.  Rather than
    guessing from a density probe (edge counts don't reveal diameter),
    spend a bounded ``lp_rounds`` budget on label propagation; if it
    converges (the common case), done.  If not, CONTRACT the graph by
    the partial labels — every label is a same-component representative,
    so edges between label values preserve component structure while
    collapsing everything the LP rounds already merged (≥ lp_rounds
    diameter steps) — and finish with
    :func:`connected_components_two_phase` on the much smaller quotient
    graph, composing node → label → component.  The budgeted rounds are
    never wasted work: their merges are exactly what shrinks the
    handoff graph.

    Output contract is identical to both underlying variants
    (component = min reachable node id): the min node m of a component
    always keeps label m, and the quotient graph of a connected
    component is connected, so the two-phase pass maps every label of
    the component to m.

    Tiny graphs (symmetrized edge count ≤ :data:`LOCAL_CC_MAX_EDGES`)
    are closed with one bounded driver collect + exact union-find
    instead — see the ceiling's rationale — with the same (node,
    min-reachable-id) output."""
    sym = _symmetrize_edges(edges, src, dst, checkpoint_dir)
    if sym.count() <= LOCAL_CC_MAX_EDGES:
        return _local_components_frame(sym)
    labels = _initial_labels(sym, checkpoint_dir)
    labels, converged = _label_prop(sym, labels, lp_rounds, checkpoint_dir)
    if converged:
        return labels.select("node", F.col("label").alias("component"))
    la = labels.select(F.col("node").alias("a"), F.col("label").alias("la"))
    lb = labels.select(F.col("node").alias("b"), F.col("label").alias("lb"))
    contracted = (
        sym.join(la, "a")
        .join(lb, "b")
        .where(F.col("la") != F.col("lb"))
        .select("la", "lb")
        .distinct()
    )
    quotient = connected_components_two_phase(
        contracted,
        src="la",
        dst="lb",
        max_iter=max_iter,
        checkpoint_dir=checkpoint_dir,
    ).withColumnRenamed("node", "label")
    return labels.join(quotient, "label", "left").select(
        "node", F.coalesce("component", "label").alias("component")
    )


def _edge_sets_equal(e_old: DataFrame, e_new: DataFrame) -> bool:
    """Convergence probe folded into ONE aggregation job: both inputs
    are distinct edge sets, so they are equal iff the signed count delta
    AND the signed xxhash64 checksum are both zero.  The checksum is a
    safe FAST PATH only — when it reports 'equal' (which happens exactly
    once, at the fixpoint) the claim is confirmed with the exact
    exceptAll pass, so a hash-collision cancellation can never terminate
    the loop early with a wrong answer.  Versus the previous
    two-exceptAll probe this removes one shuffle-heavy job from every
    non-converged round.  Decimal(38,0) accumulation keeps the sum exact
    under ANSI mode (bigint sum would overflow-throw at scale)."""
    tagged = e_old.select("u", "v", F.lit(1).alias("s")).unionAll(
        e_new.select("u", "v", F.lit(-1).alias("s"))
    )
    row = tagged.agg(
        F.sum("s").alias("dn"),
        F.sum(
            F.col("s") * F.xxhash64("u", "v").cast("decimal(38,0)")
        ).alias("dh"),
    ).collect()[0]
    if (row["dn"] or 0) != 0 or (row["dh"] or 0) != 0:
        return False
    return (
        e_new.exceptAll(e_old).limit(1).count() == 0
        and e_old.exceptAll(e_new).limit(1).count() == 0
    )


def connected_components_two_phase(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 50,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Large-star/small-star connected components (Kiveris et al.,
    SoCC'14): same (node, component) contract as
    :func:`connected_components`, but converges in O(log² n) rounds
    independent of graph diameter — the variant to use when cluster
    chains can be long (transitive near-dup chains over a 100 TB
    corpus).

    Each round alternates two edge rewrites, both expressed as one
    groupBy-min + one join (two hash shuffles keyed on node id):

    * large-star(u): connect every neighbor v > u to
      m = min(N(u) ∪ {u}) — strictly-larger neighbors re-hang below
      the local minimum;
    * small-star(u): on the resulting bigger→smaller edges, connect u
      and all its smaller neighbors to m = min(N≤(u)) — compresses
      downward paths.

    The fixpoint of the alternation is a star forest rooted at each
    component's minimum id, from which labels are read off directly.
    Convergence is detected by edge-set stability, probed with a single
    aggregation job per round (signed count + xxhash64 checksum) and
    confirmed exactly at the fixpoint — see :func:`_edge_sets_equal`.
    Lineage is truncated per round with localCheckpoint, same rationale
    as the label-propagation variant.
    """
    e = _truncate(
        edges.select(
            F.greatest(F.col(src), F.col(dst)).alias("u"),
            F.least(F.col(src), F.col(dst)).alias("v"),
        )
        .where(F.col("u") != F.col("v"))
        .distinct(),
        checkpoint_dir,
    )
    if e.limit(1).count() == 0:
        return e.select(F.col("u").alias("node"), F.col("v").alias("component"))
    for _ in range(max_iter):
        # -- large star: operate on the full (symmetric) neighborhood
        sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        lmin = (
            sym.groupBy("u")
            .agg(F.min("v").alias("nmin"))
            .select("u", F.least("nmin", F.col("u")).alias("m"))
        )
        # every strictly-larger neighbor v re-hangs onto m (m <= u < v,
        # so the emitted edge is already in bigger->smaller form)
        le = (
            sym.join(lmin, "u")
            .where(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .distinct()
        )
        # -- small star: edges are bigger->smaller, so N<=(u) is just v
        smin = le.groupBy("u").agg(F.min("v").alias("m"))
        small = (
            le.join(smin, "u")
            .where(F.col("v") != F.col("m"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .union(smin.select("u", F.col("m").alias("v")))
        )
        e_new = _truncate(small.distinct(), checkpoint_dir)
        stable = _edge_sets_equal(e, e_new)
        e = e_new
        if stable:
            # fixpoint == star forest rooted at component minima
            members = e.select(F.col("u").alias("node"), F.col("v").alias("component"))
            roots = (
                e.select(F.col("v").alias("node"))
                .distinct()
                .withColumn("component", F.col("node"))
            )
            return members.union(roots)
    raise RuntimeError(
        f"connected_components_two_phase did not converge in {max_iter} rounds"
    )


def dedup_representatives(
    df: DataFrame,
    components: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep one row per near-dup cluster: the component representative
    (min id) survives, other members drop; rows not in any component
    (singletons — never emitted as an edge endpoint) all survive.

    The anti-join side is the NON-representative member set.  For a
    heavily-duplicated corpus (web crawls routinely shed 30-80% of rows
    to dedup) that set is a large fraction of the corpus, so no
    broadcast hint is forced here: the plan stays a shuffle anti-join
    unless the runtime decides otherwise (AQE converts it to broadcast
    when the built side measures under
    spark.sql.autoBroadcastJoinThreshold — the safe direction, decided
    from observed size rather than an assumption)."""
    dupes = components.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias(id_col)
    )
    return df.join(dupes, id_col, "left_anti")
