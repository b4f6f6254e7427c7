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
      if (checkpointDir.isDefined) df.checkpoint() else df.localCheckpoint()
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
}
