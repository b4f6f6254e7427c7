package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph traversal over edge tables: iterative frontier BFS (the Pregel
  * pattern, like [[Dedup.dedupClusters]]) and, as the declarative twin,
  * Spark 4's recursive CTE SQL surface (`WITH RECURSIVE`, exercised in
  * `q_recursive_chain`). The reference's model has no graph operator;
  * these generalize its Map/Reduce contract to fixpoint computations —
  * each round IS one map (join) + one reduce (min-aggregate), iterated.
  *
  * Scale notes: each BFS round shuffles only the FRONTIER (newly
  * discovered nodes) against the edge table — work is O(edges touched),
  * not O(V x rounds). The edge table is hash-partitioned on `src` once
  * and persisted, so every round's join reuses that layout and only the
  * (small) frontier moves. Lineage is truncated per round with
  * localCheckpoint — iterative self-referencing plans otherwise grow
  * without bound (see dedupClusters). On a cluster, reliable
  * checkpointing replaces the local blocks.
  */
object Graph {

  /** Minimum-hop distance from a seed set over directed edges.
    *
    * @param edges (src: long, dst: long) — one row per directed edge
    * @param seeds (id: long) — distance-0 nodes
    * @return (id, hops) for every node reachable from a seed, hops =
    *         length of the shortest directed path (seeds themselves: 0).
    *
    * Classic frontier BFS: per round, expand the newest nodes one hop,
    * drop anything already labeled (those were reached by a shorter
    * path), append survivors. Terminates when the frontier empties —
    * at most `maxIters` rounds, after which it fails loudly rather than
    * return truncated distances. */
  def bfsHops(edges: DataFrame, seeds: DataFrame, maxIters: Int = 50,
      checkpointDir: Option[String] = None): DataFrame = {
    // on a real cluster pass `checkpointDir` for reliable (executor-
    // loss-safe) lineage truncation; local blocks otherwise
    checkpointDir.foreach(edges.sparkSession.sparkContext.setCheckpointDir)
    def truncated(df: DataFrame): DataFrame =
      if (checkpointDir.isDefined) df.checkpoint() else Caches.checkpoint(df)
    // one shuffle up front; every round's frontier join reuses it
    val e = edges.select(col("src"), col("dst"))
      .repartition(col("src")).persist()
    var dist = truncated(seeds.select(col("id")).distinct()
      .select(col("id"), lit(0L).as("hops")))
    var frontier = dist
    var iters = 0
    while (iters < maxIters && !frontier.isEmpty) {
      val expanded = frontier.join(e, frontier("id") === e("src"))
        .groupBy(e("dst").as("id"))
        .agg((min(col("hops")) + lit(1L)).as("hops"))
      val fresh = truncated(expanded.join(dist.select(col("id").as("seen")),
          expanded("id") === col("seen"), "left_anti"))
      dist = truncated(dist.unionByName(fresh))
      frontier = fresh
      iters += 1
    }
    require(frontier.isEmpty,
      s"bfsHops: frontier still non-empty after $maxIters rounds — " +
        "raise maxIters (distances would be silently truncated)")
    e.unpersist()
    dist
  }

  /** Fixed-iteration INTEGER PageRank over directed edges — the link-
    * analysis quality signal of web-corpus curation (CommonCrawl-style
    * pipelines rank hosts by centrality before admission; the
    * harmonic/PageRank family is the standard filter there). Integer
    * arithmetic end to end makes every iteration BIT-REPRODUCIBLE
    * across engines and partitionings — like [[Similarity]]'s
    * fixed-point k-means, the whole computation carries an exact SQL
    * oracle, which float PageRank cannot.
    *
    * Semantics (damping d = dampNum/dampDen, ranks scaled by `scale`):
    *   rank_0(v)   = scale
    *   rank_i+1(v) = scale*(dampDen-dampNum) DIV dampDen
    *                 + Σ_{(u,v) ∈ E} (rank_i(u) * dampNum) DIV (dampDen * outdeg(u))
    * Per-edge floor division (deterministic); DANGLING mass (nodes
    * with no out-edges) is DROPPED by default, the standard
    * simplification — ranks then order nodes identically to the
    * redistribute variant on graphs where dangling nodes are leaves.
    * With `redistributeDangling = true`, each round adds
    * `(Σ_{outdeg(u)=0} rank_i(u) · dampNum) DIV (dampDen · N)` to every
    * node — the uniform teleport of the dangling mass, still exact
    * integer arithmetic (one scalar per round, broadcast; rank totals
    * are then conserved up to per-edge/per-node floor slack). Real web
    * graphs have heavy dangling tails (leaf URLs, binary endpoints),
    * where the drop variant silently deflates hub ranks — that is the
    * variant a host-quality ranking should run. `edges` must be
    * DISTINCT (src, dst) rows; multiplicity is not weighted.
    *
    * PERSONALIZED (TrustRank) form: with `seeds = Some(df)` (an (id)
    * relation), the teleport term lands ONLY on the seed set — each
    * seed receives `(N · base) DIV |S|` per round instead of every
    * node receiving `base` (same total teleport mass up to floor
    * slack), and the dangling redistribution (when enabled) teleports
    * to the seeds too. This is the spam-demotion ranking of web
    * curation: rank flows outward from trusted hosts, so pages far
    * from any seed keep only inherited mass. With seeds = ALL nodes
    * the personalized form degenerates to the uniform one exactly
    * (`(N · base) DIV N = base` — spec-pinned). Seed ids not incident
    * to any edge are ignored (they hold no rank row).
    *
    * Scale shape: the edge table is hash-partitioned on `src` ONCE and
    * persisted; each of the `iters` rounds is one co-partitioned
    * rank⋈edge join + one map-side-combined SUM by dst + one left join
    * onto the node set — 2 shuffles of NODE-sized data per round, the
    * edge layout reused throughout (the Pregel shape, same as
    * [[bfsHops]]). A hub with 10⁶ in-links is one reducer's SUM.
    * Lineage is truncated per round (reliable via `checkpointDir` on a
    * cluster, local blocks otherwise).
    *
    * @return (id: long, rank_q: long) for every node incident to an
    *         edge, rank_q the scaled integer rank after `iters` rounds. */
  def pageRankInt(edges: DataFrame, iters: Int = 3, dampNum: Long = 85,
      dampDen: Long = 100, scale: Long = 1000000L,
      checkpointDir: Option[String] = None,
      redistributeDangling: Boolean = false,
      seeds: Option[DataFrame] = None): DataFrame = {
    require(iters >= 1 && dampDen > dampNum && dampNum > 0 && scale > 0)
    checkpointDir.foreach(edges.sparkSession.sparkContext.setCheckpointDir)
    def truncated(df: DataFrame): DataFrame =
      if (checkpointDir.isDefined) df.checkpoint() else Caches.checkpoint(df)
    val e = edges.select(col("src"), col("dst"))
      .repartition(col("src")).persist()
    // out-degree rides the same src layout as the per-round join
    val withDeg = e.join(
      e.groupBy(col("src")).agg(count(lit(1)).as("__deg")), "src").persist()
    val nodesBare = truncated(
      e.select(col("src").as("id"))
        .unionByName(e.select(col("dst").as("id"))).distinct())
    // distinct sources = the non-dangling nodes; node count N is the
    // teleport denominator (needed on the redistribute/seeded paths)
    lazy val srcs = e.select(col("src").as("__src")).distinct().persist()
    lazy val nNodes = nodesBare.count()
    val base = scale * (dampDen - dampNum) / dampDen
    // the teleport term per node, precomputed as a COLUMN of the node
    // set: uniform `base` everywhere, or (N·base) DIV |S| on seeds
    // and 0 elsewhere — seed membership is a node-sized semi-join
    // done ONCE, so rounds stay two node-sized shuffles
    val (nodes, nTeleport) = seeds match {
      case None => (nodesBare.select(col("id"), lit(base).as("__base"),
        lit(true).as("__tgt")), () => nNodes)
      case Some(sd) =>
        val seedIds = sd.select(col("id")).distinct()
          .join(nodesBare, Seq("id"), "left_semi").persist()
        val nSeeds = seedIds.count()
        require(nSeeds > 0, "pageRankInt: no seed id is incident to an edge")
        val perSeed = nNodes * base / nSeeds
        val seeded = truncated(nodesBare
          .join(seedIds.select(col("id"), lit(true).as("__isSeed")),
            Seq("id"), "left")
          .select(col("id"),
            when(col("__isSeed"), lit(perSeed)).otherwise(lit(0L))
              .as("__base"),
            coalesce(col("__isSeed"), lit(false)).as("__tgt")))
        // truncated() is eager — seedIds is baked into the node frame
        // and never read again; drop the cached relation now rather
        // than leaking it for the session lifetime
        seedIds.unpersist()
        (seeded, () => nSeeds)
    }
    var ranks = nodes.select(col("id"), lit(scale).as("rank_q"))
    for (_ <- 1 to iters) {
      val contrib = withDeg
        .join(ranks, withDeg("src") === ranks("id"))
        .select(col("dst"),
          expr(s"(rank_q * $dampNum) DIV (${dampDen}L * __deg)").as("__c"))
        .groupBy(col("dst")).agg(sum(col("__c")).as("__in"))
      val joined = nodes.join(contrib, nodes("id") === contrib("dst"), "left")
      ranks = truncated(
        if (!redistributeDangling)
          joined.select(col("id"),
            (col("__base") + coalesce(col("__in"), lit(0L))).as("rank_q"))
        else {
          // the round's dangling mass: ONE scalar row (an anti-join of
          // node-sized relations + a SUM), broadcast — never a
          // per-node join against the dangling set. It teleports where
          // the base term does: uniformly, or onto the seeds.
          val dm = ranks.join(srcs, ranks("id") === col("__src"), "left_anti")
            .agg(coalesce(sum(col("rank_q")), lit(0L)).as("__dm"))
          val shareCol = when(col("__tgt"),
            expr(s"(__dm * $dampNum) DIV (${dampDen}L * ${nTeleport()})"))
            .otherwise(lit(0L))
          joined.crossJoin(broadcast(dm))
            .select(col("id"),
              (col("__base") + coalesce(col("__in"), lit(0L)) + shareCol)
                .as("rank_q"))
        })
    }
    e.unpersist()
    withDeg.unpersist()
    if (redistributeDangling) srcs.unpersist()
    ranks
  }
}
