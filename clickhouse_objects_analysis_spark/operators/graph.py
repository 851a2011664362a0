"""Distributed graph statistics beyond the lineage suite's reachability
ops (connected components live in operators/dedup.py, PageRank and
transitive closure in plans/lineage.py / queries/lineage_queries.py).

Reference parity note: the reference repo builds a dependency graph but
only walks it (ch_view_dependencies.py); triangle/clustering statistics
extend the graph surface for the data-curation charter (e.g. auditing
whether near-duplicate similarity is transitive, or how clumped a
co-occurrence graph is).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

#: Degree-orientation key: a single BIGINT that sorts by (degree, node)
#: so ties between equal-degree nodes break deterministically. Node ids
#: must fit in 40 bits (1e12) — true for every testdata key space and
#: checked nowhere hot (the multiply would overflow loudly, not wrap
#: silently, under Spark's ANSI-off long arithmetic at realistic degrees).
_KEY = lambda deg, node: deg * F.lit(1_000_000_000_000) + node  # noqa: E731

#: Node count past which the iterative loops (LPA / personalized
#: PageRank) stop relying on AQE to broadcast the per-round node-sized
#: state table (~600k nodes ≈ 10 MB, the default broadcast threshold)
#: and switch to a persist()-cached adjacency pre-partitioned on the
#: loop's join key + per-round ShuffledHashJoin. Below the gate the
#: broadcast loop is strictly cheaper; above it the planner would
#: otherwise sort-merge-join — i.e. SORT the E-sized adjacency — every
#: round (measured sf10: LPA 182.6→64.6 s, PPR 92.5→54.8 s).
_BROADCAST_NODES_GATE = 600_000

#: Input-bytes gate for PPR's adjacency storage (r14, VERDICT #2): below
#: this many bytes of scanned parquet the doubled adjacency materializes
#: as a DIRECT eager localCheckpoint — the fastest arm of the r13 A/B
#: matrix (3.7 s vs the 5.5 s persist at sf0.1: per-round reads hit
#: materialized row blocks instead of deserializing the columnar cache)
#: — and above it as the evictable persist() that survives sf10 (the
#: checkpoint arm OOM-flapped there: checkpointed blocks are pinned
#: until GC, next to the big-arm's persisted adj_deg). The gate reads
#: the SCAN FILE SIZES from the plan (zero jobs, known before any count
#: exists — the reason the r14 cache->checkpoint conversion A/B gained
#: nothing is that a count-based gate can only fire after the cache is
#: already built). 256 MiB sits a decade under the observed flap point
#: (sf10 ≈ 1.1 GiB of lineitem) and a decade over sf0.1 (10.8 MiB);
#: unknown input sizes (in-memory test frames, non-file sources) route
#: to the persist arm — the OOM-proof default.
_PPR_SMALL_INPUT_BYTES = 256 << 20


def _scan_input_bytes(df: DataFrame) -> int | None:
    """Total on-disk bytes of the file scans feeding ``df``'s plan, or
    None when any input is not a resolvable local file (then callers
    must assume BIG). A logical-plan walk — no Spark job."""
    import os
    from urllib.parse import urlparse

    try:
        files = df.inputFiles()
    except Exception:
        return None
    if not files:
        return None
    total = 0
    for f in files:
        p = urlparse(f)
        if p.scheme not in ("", "file"):
            return None
        try:
            total += os.path.getsize(p.path)
        except OSError:
            return None
    return total


def triangle_stats(edges: DataFrame, src: str, dst: str) -> DataFrame:
    """Exact triangle count + global clustering coefficient over an
    undirected simple graph given as a (src, dst) edge list (any
    orientation, duplicates tolerated — canonicalized internally).

    Algorithm: degree orientation (Cohen / "MapReduce counting
    triangles" — each undirected edge is directed from its lower
    (degree, id) endpoint to its higher one), which bounds every
    out-degree by O(sqrt(m)); wedges are then generated only at each
    triangle's minimum-key apex and closed with ONE join back to the
    oriented edge list, so each triangle is counted exactly once and
    the wedge-candidate stream is O(m^1.5) worst case instead of the
    O(Σ deg²) of naive neighbor pairing — the difference between a
    star-heavy 100 TB graph finishing and not.

    Returns a single row: (n_nodes, n_edges, n_triangles, n_wedges,
    global_clustering) where n_wedges = Σ C(deg, 2) (closed + open)
    and global_clustering = 3·triangles / wedges rounded to 6 digits
    (one double division — no order-dependent float accumulation).
    """
    a, b = F.col(src).cast("long"), F.col(dst).cast("long")
    canon = (
        edges.select(
            F.least(a, b).alias("u"), F.greatest(a, b).alias("v")
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=False)  # feeds degrees AND orientation
    )
    deg = (
        canon.select(F.col("u").alias("n"))
        .unionAll(canon.select(F.col("v").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    # Orientation keys: join degrees onto both endpoints. The degree
    # table is node-cardinality-sized — usually the small side but NOT
    # guaranteed broadcastable at 100 TB (billions of nodes), so leave
    # the strategy to AQE instead of forcing a broadcast that could OOM
    # the driver on a web-scale graph.
    ku = deg.select(F.col("n").alias("u"), _KEY(F.col("deg"), F.col("u")).alias("ku"))
    kv = deg.select(F.col("n").alias("v"), _KEY(F.col("deg"), F.col("v")).alias("kv"))
    keyed = canon.join(ku, "u").join(kv, "v")
    oriented = keyed.select(
        F.when(F.col("ku") < F.col("kv"), F.col("u")).otherwise(F.col("v")).alias("s"),
        F.when(F.col("ku") < F.col("kv"), F.col("v")).otherwise(F.col("u")).alias("d"),
        F.greatest("ku", "kv").alias("dkey"),
    ).localCheckpoint(eager=False)  # read three times below
    # Wedges at the apex: two out-edges (s→b), (s→c) with key(b)<key(c);
    # the closing edge, if present, is oriented b→c by key order, so one
    # equi-join on the oriented list decides closure.
    e1 = oriented.select(F.col("s"), F.col("d").alias("b"), F.col("dkey").alias("bk"))
    e2 = oriented.select(F.col("s"), F.col("d").alias("c"), F.col("dkey").alias("ck"))
    wedge = e1.join(e2, "s").filter(F.col("bk") < F.col("ck"))
    closing = oriented.select(F.col("s").alias("b"), F.col("d").alias("c"))
    tri = wedge.join(closing, ["b", "c"]).agg(
        F.count(F.lit(1)).cast("long").alias("n_triangles")
    )
    totals = deg.agg(
        F.count(F.lit(1)).cast("long").alias("n_nodes"),
        (F.sum(F.col("deg") * (F.col("deg") - 1)) / 2).cast("long").alias("n_wedges"),
    )
    edges_n = canon.agg(F.count(F.lit(1)).cast("long").alias("n_edges"))
    return (
        totals.crossJoin(edges_n)
        .crossJoin(tri)
        .select(
            "n_nodes",
            "n_edges",
            "n_triangles",
            "n_wedges",
            F.round(
                F.lit(3.0) * F.col("n_triangles") / F.col("n_wedges"), 6
            ).alias("global_clustering"),
        )
    )


def k_core(
    edges: DataFrame,
    src: str,
    dst: str,
    k: int,
    max_iter: int = 30,
) -> DataFrame:
    """Nodes of the k-core (maximal subgraph where every node has degree
    ≥ k) of an undirected simple graph, by iterative peeling: drop every
    node with current degree < k, restrict the edge list to survivors,
    repeat to fixpoint. Returns (node, deg) with each survivor's degree
    INSIDE the k-core.

    Scale shape (r9 #6 / r10 #4 — frontier-incremental degree
    maintenance): the DOUBLED adjacency (n, m) materializes once;
    per-round state is the (n, deg) map — node-sized, orders of
    magnitude smaller than the edges. Degrees are computed from the
    full adjacency ONCE; every later round touches only the edges
    incident to the nodes REMOVED in that round (the frontier):
    deg'(n) = deg(n) − #(neighbors of n in removed), which is exact
    because a peel step deletes precisely the removed-endpoint edges.
    The frontier shrinks geometrically after round 1, so the per-round
    adjacency⋈removed semi-join broadcasts its tiny probe side (falling
    back to a pinned ShuffledHashJoin against the m-partitioned persisted
    adjacency while the frontier is still above the broadcast gate —
    round 1 can remove most of the graph), and the delta aggregate is
    sized by incident edges, not by the surviving edge list. The old
    formulation re-aggregated degrees over ALL surviving edges every
    round; that full-E scan per round is what kept the sf1→sf10 decade
    exponent at ~0.81. Peeling rounds are bounded by the graph's
    degeneracy ordering depth — tens of rounds for real similarity
    graphs, `max_iter` as the hard stop.
    """
    a, b = F.col(src).cast("long"), F.col(dst).cast("long")
    canon = (
        edges.select(F.least(a, b).alias("u"), F.greatest(a, b).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    # localCheckpoint, NOT persist: the peel loop re-reads the
    # adjacency EVERY round, and checkpointed row blocks read faster
    # than the columnar cache (persist() was A/B-measured 1.6x slower
    # at sf1 AND sf10 in r13); k_core never exhibited PPR's
    # double-residency OOM because its loop input IS adj.
    adj = (
        canon.select(F.col("u").alias("n"), F.col("v").alias("m"))
        .unionAll(canon.select(F.col("v").alias("n"), F.col("u").alias("m")))
        .localCheckpoint(eager=True)
    )
    n_nodes = adj.select("n").distinct().count()
    # sub-gate graphs: driver peel (see _GRAPH_DRIVER_NODES — the
    # fixpoint is deterministic, identical survivors/degrees); rides
    # the node count this loop computes anyway, adj.count() only runs
    # once the node arm passes (cheap scan of checkpointed blocks)
    if (
        n_nodes <= _GRAPH_DRIVER_NODES
        and adj.count() <= 2 * _GRAPH_DRIVER_GATE
    ):
        return _driver_k_core(adj.collect(), k, max_iter, edges.sparkSession)
    big = n_nodes > _BROADCAST_NODES_GATE
    if big:
        adj = adj.repartition(F.col("m")).persist()

    # Full-adjacency degree pass — the ONLY edge-complete aggregation.
    nd = (
        adj.groupBy("n")
        .agg(F.count(F.lit(1)).cast("long").alias("deg"))
        .localCheckpoint(eager=True)
    )
    # r15 lazy rounds (VERDICT r14 #3): removed/nd checkpoints are LAZY
    # — the per-round convergence count materializes the whole chain in
    # ONE job (CC-style), dropping ~2 job dispatches per peel round.
    # Per the r14 LPA lesson ("lazy round-chaining is only safe when
    # every per-round join's small side is explicitly hinted") the
    # nd-side delta join is pinned shuffle_hash; the lazy arm WITHOUT
    # that hint A/B-measured consistently worse (tools/ab_r15_kcore.py:
    # 3 sessions at a 6M-edge sf1-scale graph — eager mins
    # 8.28/7.04/6.90 s, lazy 7.57/7.93/—, lazy+hint 6.84/6.89/6.16 s,
    # identical survivors in every arm).
    for _ in range(max_iter):
        removed = (
            nd.filter(F.col("deg") < k).select("n").localCheckpoint(
                eager=False
            )
        )
        n_removed = removed.count()
        if n_removed == 0:
            break
        rm_m = removed.select(F.col("n").alias("m"))
        if n_removed <= _BROADCAST_NODES_GATE:
            probe = F.broadcast(rm_m)
        elif big:
            probe = rm_m.hint("shuffle_hash")
        else:
            probe = rm_m
        delta = (
            adj.join(probe, "m", "left_semi")
            .groupBy("n")
            .agg(F.count(F.lit(1)).cast("long").alias("dd"))
        )
        nd = (
            nd.filter(F.col("deg") >= k)
            .join(delta.hint("shuffle_hash"), "n", "left")
            .select(
                "n",
                (
                    F.col("deg") - F.coalesce(F.col("dd"), F.lit(0))
                ).alias("deg"),
            )
            .localCheckpoint(eager=False)
        )
    # At fixpoint nd's degrees are exactly the alive-induced subgraph
    # degrees (maintained incrementally), so the answer needs no extra
    # pass. On max_iter exhaustion the filter matches the old contract:
    # degrees w.r.t. the final alive set, sub-k stragglers dropped.
    result = nd.filter(F.col("deg") >= k).localCheckpoint(eager=True)
    if big:
        adj.unpersist(blocking=False)
    return result


#: Driver-kernel gate for the iterative graph loops (PPR/LPA): below
#: this edge count the per-round work is pure job-scheduling overhead
#: (sub-MB state, dozens of Spark jobs), so the EXACT deterministic
#: recurrence replays on the driver instead — same outputs
#: bit-for-bit, measured ~4-5x at sf0.1. 100k edges collect to ~2 MB.
_GRAPH_DRIVER_GATE = 100_000

#: Node-count arm of the driver gate: checked FIRST because every
#: iterative loop already computes the node count for its broadcast
#: strategy — the gate adds ZERO jobs on the big path (an explicit
#: edge probe, even an early-terminating limit-count over the raw
#: input, was measured tipping the second sf10 PPR sweep iteration
#: over the heap edge).
_GRAPH_DRIVER_NODES = 50_000


def _driver_k_core(adj_rows, k: int, max_iter: int, spark) -> DataFrame:
    """Driver peel of the k-core fixpoint over the collected DOUBLED
    adjacency (heap-free repeated filtering — the graph is small by
    the gate). Bounded by the SAME ``max_iter`` as the distributed
    peel, with the same sub-k-straggler drop on exhaustion, so both
    paths return identical rows even on a graph whose peel needs more
    than ``max_iter`` rounds (e.g. a long chain at k=2)."""
    adj: dict[int, set[int]] = {}
    for r in adj_rows:
        adj.setdefault(r["n"], set()).add(r["m"])
    for _ in range(max_iter):
        doomed = [n for n, neigh in adj.items() if len(neigh) < k]
        if not doomed:
            break
        for n in doomed:
            for m in adj[n]:
                adj[m].discard(n)
            del adj[n]
    return spark.createDataFrame(
        sorted(
            (n, len(neigh))
            for n, neigh in adj.items()
            if len(neigh) >= k
        )
        or [(None, None)],
        "n long, deg long",
    ).filter(F.col("n").isNotNull())


def _driver_ppr(adj_rows, seedset, rounds: int, spark) -> DataFrame:
    """Driver replay of personalized_pagerank's integer-nano
    recurrence over the collected DOUBLED adjacency; the seed set is
    evaluated by the caller through its Column predicate on the
    already-materialized node table."""
    adj: dict[int, list[int]] = {}
    for r in adj_rows:
        adj.setdefault(r["n"], []).append(r["m"])
    base_nano = 1_000_000_000 // max(len(seedset), 1)
    rank = {n: (base_nano if n in seedset else 0) for n in adj}
    for _ in range(rounds):
        inflow = dict.fromkeys(adj, 0)
        for n, neigh in adj.items():
            share = rank[n] // len(neigh)
            if share:
                for m in neigh:
                    inflow[m] += share
        rank = {
            n: (
                15 * (base_nano if n in seedset else 0)
                + 85 * inflow[n]
            )
            // 100
            for n in adj
        }
    return spark.createDataFrame(
        [(n, len(adj[n]), rank[n]) for n in sorted(adj)],
        "n long, deg long, rank_nano long",
    )


def _driver_lpa(adj_rows, rounds: int, spark) -> DataFrame:
    """Driver replay of label_propagation's synchronous
    most-frequent-neighbor-label recurrence (ties to the smallest
    label) over the collected DOUBLED adjacency — identical outputs
    to the distributed rounds by construction."""
    adj: dict[int, list[int]] = {}
    for r in adj_rows:
        adj.setdefault(r["n"], []).append(r["m"])
    lbl = {n: n for n in adj}
    for _ in range(rounds):
        new = {}
        for n, neigh in adj.items():
            votes: dict[int, int] = {}
            for m in neigh:
                votes[lbl[m]] = votes.get(lbl[m], 0) + 1
            new[n] = max(votes.items(), key=lambda kv: (kv[1], -kv[0]))[0]
        lbl = new
    return spark.createDataFrame(
        sorted(lbl.items()), "n long, lbl long"
    )


def personalized_pagerank(
    edges: DataFrame,
    src: str,
    dst: str,
    seed_pred,
    rounds: int,
) -> DataFrame:
    """Personalized PageRank over an undirected simple graph in EXACT
    INTEGER NANO arithmetic: ranks are integers out of 1e9, each round
    every node ships floor(rank / degree) to each neighbor and is
    re-ranked (15·base + 85·inflow) // 100, with the teleport mass
    `base` = 1e9 // |seeds| on seed nodes (seed_pred is a Column
    predicate over the node id column "n"). Integer division everywhere
    means NO float accumulation order exists to diverge — any engine
    replaying the same rounds lands on the same nanos bit-for-bit
    (the r8_wave16 DuckDB twin unrolls the rounds).

    Returns (n, deg, rank_nano). Scale shape is the LPA/k-core loop
    discipline: the doubled adjacency and degree tables materialize
    once; per-round state is the node-sized rank table; each round is
    one E-sized join + one (node) aggregation. Mass deliberately leaks
    at floor-division remainders (< |E| nanos/round) — documented,
    deterministic, and irrelevant to ranking order."""
    a, b = F.col(src).cast("long"), F.col(dst).cast("long")
    canon = (
        edges.select(F.least(a, b).alias("u"), F.greatest(a, b).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    # Storage routed on the SCAN INPUT SIZE (zero extra jobs — see
    # _PPR_SMALL_INPUT_BYTES): small inputs take a direct eager
    # localCheckpoint (the fastest r13-matrix arm — per-round reads hit
    # row blocks, no columnar-cache deserialization); big or unknown
    # inputs keep the evictable persist() — the doubled adjacency is
    # the big heap item at sf10 (120M rows pinned next to the loop's
    # persisted adj_deg put the 16g heap on the OOM edge — the r13
    # sweep caught the checkpoint arm flapping there). A cache is
    # evictable-with-recompute AND explicitly unpersistable the moment
    # adj_deg materializes; a checkpoint is neither, which is exactly
    # why it must never carry a big graph.
    in_bytes = _scan_input_bytes(edges)
    small_input = in_bytes is not None and in_bytes <= _PPR_SMALL_INPUT_BYTES
    adj_plan = canon.select(
        F.col("u").alias("n"), F.col("v").alias("m")
    ).unionAll(canon.select(F.col("v").alias("n"), F.col("u").alias("m")))
    adj = (
        adj_plan.localCheckpoint(eager=True)
        if small_input
        else adj_plan.persist()
    )
    deg = adj.groupBy("n").agg(F.count(F.lit(1)).cast("long").alias("deg"))
    nodes = deg.select("n", "deg").localCheckpoint(eager=True)
    n_nodes = nodes.count()  # also gates the big-graph loop strategy
    # Sub-gate graphs route to the driver kernel (the
    # connected_components_auto discipline): the integer-nano
    # arithmetic is EXACT, so the python replay lands on the same
    # nanos bit-for-bit, and `rounds` eager per-round checkpoints of
    # pure scheduling overhead disappear. Gate rides the node count
    # already computed for the broadcast strategy — zero extra jobs
    # on the big path.
    if (
        n_nodes <= _GRAPH_DRIVER_NODES
        and adj.count() <= 2 * _GRAPH_DRIVER_GATE
    ):
        seedset = {
            r["n"] for r in nodes.filter(seed_pred).collect()
        }
        adj_rows = adj.collect()
        if not small_input:
            adj.unpersist(blocking=False)  # the cache promise above
            # holds on the driver path too — nothing reads adj after
            # collect() (checkpoint arm: blocks free on GC)
        return _driver_ppr(
            adj_rows, seedset, rounds, edges.sparkSession
        )
    big = n_nodes > _BROADCAST_NODES_GATE
    # Degree folded into the adjacency ONCE (removes a per-round E⋈V
    # join). Loop strategy gates on node count (r8 verdict #5):
    # - small graphs: AQE broadcasts the node-sized rank table into a
    #   BroadcastHashJoin each round — the adjacency never shuffles and
    #   nothing needs pre-partitioning.
    # - big graphs (rank table past the broadcast threshold, where the
    #   planner would otherwise SORT the E-sized side every round in a
    #   sort-merge join): materialize the adjacency ONCE pre-partitioned
    #   on the join key via persist() — localCheckpoint drops
    #   outputPartitioning in this Spark build (probed:
    #   UnknownPartitioning) — so each round's ShuffledHashJoin
    #   re-exchanges only the rank table. Measured at sf10: 92.5 s →
    #   54.8 s. The cache is unpersisted before returning (rounds run
    #   eagerly, the returned plan reads the final checkpoint only).
    if big:
        adj_deg = adj.join(nodes, "n").repartition(F.col("n")).persist()
        adj_deg.count()  # materialize, then drop the raw cache — the
        if not small_input:  # loop reads adj_deg only
            adj.unpersist(blocking=False)
    else:
        # Small-arm adjacency storage is whatever the input-bytes gate
        # picked above: DIRECT checkpoint under the gate (the 3.7 s
        # r13-matrix arm — note a cache→checkpoint CONVERSION here was
        # A/B-measured a wash, old 6.1-6.9 s vs new 6.1-7.0 s at
        # sf0.1: the conversion copy costs what the per-round
        # checkpoint reads save; only deciding BEFORE the cache is
        # built, i.e. from scan bytes, recovers the fast arm), persist
        # above it or when input sizes are unknowable.
        # lazy on purpose: a map-side broadcast join per round over the
        # cached 2-col adjacency is cheaper than materializing a
        # second, 3-col E-sized checkpoint (measured +8 s at sf1).
        # `nodes`, not `deg`: the checkpointed table broadcasts as-is,
        # while deg would re-run the E-sized degree agg every round.
        adj_deg = adj.join(F.broadcast(nodes), "n")
    seeds = nodes.filter(seed_pred).select("n")
    n_seeds = seeds.count()  # driver scalar: sizes the teleport mass
    base_nano = 1_000_000_000 // max(n_seeds, 1)
    base = nodes.join(seeds, "n", "left_semi").select(
        "n", F.lit(base_nano).alias("base")
    )
    ranks = nodes.join(base, "n", "left").select(
        "n", F.coalesce(F.col("base"), F.lit(0)).alias("r")
    )
    for _ in range(rounds):
        rhs = ranks.hint("shuffle_hash") if big else ranks
        share = adj_deg.join(rhs, "n").select(
            "m", F.expr("r div deg").alias("s")
        )
        inflow = share.groupBy(F.col("m").alias("n")).agg(
            F.sum("s").cast("long").alias("inflow")
        )
        ranks = (
            nodes.join(inflow, "n", "left")
            .join(base, "n", "left")
            .select(
                "n",
                F.expr(
                    "(15 * coalesce(base, 0L) + 85 * coalesce(inflow, 0L))"
                    " div 100"
                ).alias("r"),
            )
            # node-sized per-round state. Big arm: EAGER — each round
            # must finish before adj_deg is unpersisted below, and at
            # sf10 an unmaterialized round chain would re-read the
            # E-sized cache under heap pressure. Small arm: LAZY — the
            # rounds collapse into ONE materializing job at the final
            # checkpoint, `rounds` fewer job dispatches (r14
            # same-session A/B ×3 sessions: lazy mins 5.16/5.46/5.01 s
            # vs eager 5.40/5.98/4.81 s at sf0.1 — two wins, one wash;
            # kept for the dispatch saving, which grows with `rounds`).
            # NOTE: safe here because every per-round join explicitly
            # broadcasts its node-sized side (adj_deg folds
            # F.broadcast(nodes)); LPA's unhinted join planned WORSE
            # against a lazy chain and stays eager — see
            # label_propagation.
            .localCheckpoint(eager=big)
        )
    out = nodes.join(ranks, "n").select(
        "n", "deg", F.col("r").alias("rank_nano")
    )
    if big:
        out = out.localCheckpoint(eager=True)
        adj_deg.unpersist(blocking=False)
    else:
        # materialize the lazy round chain in one job, THEN free the
        # adjacency cache — unpersisting first would force every round
        # to recompute the canon+union pipeline from scratch
        out = out.localCheckpoint(eager=True)
        if not small_input:
            adj.unpersist(blocking=False)
    return out


def label_propagation(
    edges: DataFrame, src: str, dst: str, rounds: int
) -> DataFrame:
    """SYNCHRONOUS label propagation community detection over an
    undirected simple graph, fully deterministic: every node starts
    labeled with its own id; each round, every node simultaneously
    adopts the most frequent label among its neighbors' PREVIOUS-round
    labels, ties broken by the smallest label. A FIXED round count
    (caller-chosen) rather than a convergence test — synchronous LPA
    can 2-cycle on bipartite structures, so "run until stable" is not
    well-defined; fixed-round is both the reproducible variant and the
    one a SQL engine can replay by unrolling (the r8_wave8 oracle).

    Returns (n, lbl). Scale shape mirrors k_core: the doubled adjacency
    list is materialized once; per-round state is the node-sized label
    table (one hash join adjacency⋈labels, one (node, label) count, one
    per-node top-1 window whose group width is bounded by the node's
    degree). Rounds are a constant, so the 100 TB cost is
    rounds × (one shuffle of E + one of V)."""
    a, b = F.col(src).cast("long"), F.col(dst).cast("long")
    canon = (
        edges.select(F.least(a, b).alias("u"), F.greatest(a, b).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    # localCheckpoint, NOT persist — the k_core note: LPA's loop also
    # re-reads the adjacency every round.
    # r15: the checkpoint's STORAGE LEVEL is routed on scan input bytes
    # (the PPR storage-gate discipline, zero jobs): the default level
    # stores DESERIALIZED Java rows (MemoryStore.putIteratorAsValues),
    # and at sf30 unrolling the doubled adjacency that way OOM'd the
    # 16g heap outright (stack: putIteratorAsValues → SizeEstimator →
    # heap) in a fresh JVM with nothing else running. Big or unknowable
    # inputs take PySpark's MEMORY_AND_DISK (the SERIALIZED level —
    # the deserialized default is MEMORY_AND_DISK_DESER): serialized
    # blocks unroll incrementally and evict to disk instead of dying;
    # small (local bench) inputs keep the fast deserialized default,
    # so sf0.1/sf1 behavior is unchanged.
    from pyspark import StorageLevel

    in_bytes = _scan_input_bytes(edges)
    big_input = in_bytes is None or in_bytes > _PPR_SMALL_INPUT_BYTES
    adj = (
        canon.select(F.col("u").alias("n"), F.col("v").alias("m"))
        .unionAll(canon.select(F.col("v").alias("n"), F.col("u").alias("m")))
        .localCheckpoint(
            eager=True,
            storageLevel=(
                StorageLevel.MEMORY_AND_DISK if big_input else None
            ),
        )
    )
    labels = (
        adj.select("n")
        .distinct()
        .withColumn("lbl", F.col("n"))
        .localCheckpoint(eager=True)
    )
    # Loop strategy gates on node count (r8 verdict #5; same rationale
    # as personalized_pagerank): small graphs let AQE broadcast the
    # label table each round; big graphs (labels past the broadcast
    # threshold, where the planner would SORT the E-sized adjacency in
    # a sort-merge join EVERY round — the dominant sf10 cost) read the
    # adjacency from a persist() cache pre-partitioned on the join key,
    # so each round's ShuffledHashJoin re-exchanges only the label
    # table. Measured at sf10: 182.6 s → 64.6 s. Unpersisted on exit;
    # rounds run eagerly, the returned plan reads the final checkpoint.
    n_nodes = labels.count()
    # sub-gate graphs: driver replay of the same synchronous rounds
    # (identical labels by construction); rides the existing count
    if (
        n_nodes <= _GRAPH_DRIVER_NODES
        and adj.count() <= 2 * _GRAPH_DRIVER_GATE
    ):
        return _driver_lpa(adj.collect(), rounds, edges.sparkSession)
    big = n_nodes > _BROADCAST_NODES_GATE
    if big:
        adj = adj.repartition(F.col("m")).persist()
    for _ in range(rounds):
        rhs = labels.select(F.col("n").alias("m"), "lbl")
        # Small arm: EXPLICIT broadcast — the gate already guarantees
        # the label table fits (≤600k nodes ≈ 10 MB, the same bound
        # PPR's broadcast(nodes) rides), so the plan no longer depends
        # on AQE seeing materialized stats. That certainty is what
        # makes the lazy per-round checkpoints below safe here (the
        # r14 lesson recorded at the checkpoint: lazy round-chaining is
        # only safe when every per-round join's small side is
        # explicitly hinted).
        rhs = rhs.hint("shuffle_hash") if big else F.broadcast(rhs)
        votes = (
            adj.join(rhs, "m")
            .groupBy("n", "lbl")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        # top-1 (count DESC, label ASC) as a max-struct aggregation —
        # struct order (c, -lbl) makes max() the frequency argmax with
        # the min-label tie-break, replacing a per-node row_number sort
        # window over the full vote stream with a partial-aggregating
        # hash agg (map-side combine, no sort, no second shuffle).
        top = votes.groupBy("n").agg(
            F.max(
                F.struct(F.col("c"), (-F.col("lbl")).alias("nl"))
            ).alias("t")
        )
        # node-sized per-round state. Big arm: EAGER (rounds must
        # finish before adj is unpersisted; sf10 heap discipline).
        # Small arm: LAZY — safe ONLY because rhs above is explicitly
        # broadcast. The r14 batch-2 A/B measured lazy rounds WITHOUT
        # the hint consistently slower (eager 5.3-6.8 s vs lazy
        # 6.2-10.8 s at sf0.1: the planner saw an unmaterialized label
        # chain with unknown stats); WITH the hint, lazy+broadcast won
        # two continuation-2 sessions (old mins 3.89/3.74 s vs new
        # 3.70/3.58 s) — the PPR lesson transplanted.
        labels = top.select(
            "n", (-F.col("t.nl")).alias("lbl")
        ).localCheckpoint(eager=big)
    if big:
        adj.unpersist(blocking=False)
    else:
        # materialize the lazy round chain before returning
        labels = labels.localCheckpoint(eager=True)
    return labels
