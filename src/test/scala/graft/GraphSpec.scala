package graft

import org.apache.spark.sql.functions._

import graft.operators.Graph

class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("bfsHops: shortest hop distances on a known graph") {
    // 1 -> 2 -> 3 -> 4, plus shortcut 1 -> 3 and a cycle 4 -> 1;
    // 9 -> 10 is unreachable from the seed
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 3L), (4L, 1L),
      (9L, 10L)).toDF("src", "dst")
    val seeds = Seq(1L).toDF("id")
    val got = Graph.bfsHops(edges, seeds).as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 0L, 2L -> 1L, 3L -> 1L, 4L -> 2L))
  }

  test("bfsHops: multiple seeds take the nearest one; seeds dedup") {
    val edges = Seq((1L, 2L), (2L, 3L), (5L, 3L)).toDF("src", "dst")
    val seeds = Seq(1L, 5L, 5L).toDF("id")
    val got = Graph.bfsHops(edges, seeds).as[(Long, Long)].collect().toMap
    // node 3: 2 hops via 1->2->3 but 1 hop via 5->3
    assert(got === Map(1L -> 0L, 5L -> 0L, 2L -> 1L, 3L -> 1L))
  }

  test("bfsHops: reliable-checkpoint mode matches local mode") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 3L)).toDF("src", "dst")
    val seeds = Seq(1L).toDF("id")
    val dir = java.nio.file.Files.createTempDirectory("graft_bfs_ckpt").toString
    val reliable = Graph.bfsHops(edges, seeds, checkpointDir = Some(dir))
      .as[(Long, Long)].collect().toMap
    val local = Graph.bfsHops(edges, seeds).as[(Long, Long)].collect().toMap
    assert(reliable === local)
  }

  test("bfsHops: empty seed set yields empty result") {
    val edges = Seq((1L, 2L)).toDF("src", "dst")
    val seeds = Seq.empty[Long].toDF("id")
    assert(Graph.bfsHops(edges, seeds).count() === 0L)
  }

  test("bfsHops fails loudly when maxIters is too small for the diameter") {
    val chain = (1L until 6L).map(i => (i, i + 1)).toDF("src", "dst")
    val seeds = Seq(1L).toDF("id")
    val e = intercept[IllegalArgumentException] {
      Graph.bfsHops(chain, seeds, maxIters = 2)
    }
    assert(e.getMessage.contains("frontier still non-empty"))
  }

  test("recursive CTE chain matches an iterative computation") {
    // q_recursive_chain semantics on a tiny in-memory "part" table
    spark.range(1, 50).select(col("id").as("p_partkey"))
      .createOrReplaceTempView("part")
    val got = spark.sql("""
      WITH RECURSIVE anc(p_partkey, anc, depth) AS (
        SELECT p_partkey, p_partkey DIV 10, CAST(1 AS BIGINT) FROM part
        UNION ALL
        SELECT p_partkey, anc DIV 10, depth + 1 FROM anc WHERE anc > 0
      )
      SELECT p_partkey, max(depth) AS depth, count(*) AS n_anc,
             sum(anc) AS sum_anc
      FROM anc GROUP BY p_partkey""")
      .as[(Long, Long, Long, Long)].collect().toMap2
    def chain(p: Long): Seq[Long] =
      Iterator.iterate(p / 10)(_ / 10).takeWhile(_ > 0).toSeq :+ 0L
    (1L until 50L).foreach { p =>
      val c = chain(p)
      assert(got(p) === ((c.length.toLong, c.length.toLong, c.sum)),
        s"part $p chain $c")
    }
  }

  implicit class Tup4Map(rows: Array[(Long, Long, Long, Long)]) {
    def toMap2: Map[Long, (Long, Long, Long)] =
      rows.map(r => r._1 -> ((r._2, r._3, r._4))).toMap
  }

  test("pageRankInt: hand-computed ranks on a known graph") {
    // star into 3: 1->3, 2->3; 3->1 closes a loop; 4 dangling source
    val edges = Seq((1L, 3L), (2L, 3L), (3L, 1L), (4L, 1L))
      .toDF("src", "dst")
    val got = Graph.pageRankInt(edges, iters = 2)
      .as[(Long, Long)].collect().toMap
    // scale 1e6, d=85/100, base=150000; per-edge floor contributions.
    // r0: all 1000000.
    // iter1: deg(1)=deg(2)=deg(3)=deg(4)=1
    //   c(3) = (1e6*85)/(100*1) * 2 = 850000*2 -> r1(3)=150000+1700000
    //   c(1) = 850000 (from 3) + 850000 (from 4) -> r1(1)=1850000
    //   r1(2)=150000, r1(4)=150000
    // iter2:
    //   c(3) = (1850000*85)DIV100 + (150000*85)DIV100 = 1572500+127500
    //   r2(3) = 150000+1700000 = 1850000
    //   c(1) = (1850000*85)DIV100 [from 3] + (150000*85)DIV100 [from 4]
    //        = 1572500+127500 -> r2(1)=1850000
    assert(got === Map(1L -> 1850000L, 2L -> 150000L, 3L -> 1850000L,
      4L -> 150000L))
  }

  test("pageRankInt: per-edge floor division splits out-degree mass") {
    // 1 has out-degree 3: each edge carries (r*85) DIV (100*3)
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("src", "dst")
    val got = Graph.pageRankInt(edges, iters = 1)
      .as[(Long, Long)].collect().toMap
    val share = (1000000L * 85) / 300 // 283333 (floored)
    assert(got(2L) === 150000L + share)
    assert(got(3L) === 150000L + share)
    assert(got(4L) === 150000L + share)
    assert(got(1L) === 150000L) // nothing points at 1
  }

  test("pageRankInt: reliable-checkpoint mode is bit-identical") {
    val edges = Seq((1L, 3L), (2L, 3L), (3L, 1L), (4L, 1L))
      .toDF("src", "dst")
    val dir = java.nio.file.Files.createTempDirectory("prckpt").toString
    val local = Graph.pageRankInt(edges, iters = 3)
      .as[(Long, Long)].collect().toMap
    val reliable = Graph.pageRankInt(edges, iters = 3,
        checkpointDir = Some(dir))
      .as[(Long, Long)].collect().toMap
    assert(local === reliable)
  }

  test("pageRankInt: a hub with many in-links outranks leaf nodes") {
    // 20 leaves all point at node 100; 100 points at 101
    val edges = ((1L to 20L).map(i => (i, 100L)) :+ ((100L, 101L)))
      .toDF("src", "dst")
    val got = Graph.pageRankInt(edges, iters = 3)
      .as[(Long, Long)].collect().toMap
    assert(got(100L) > got(101L))
    assert(got(101L) > got(1L))
    assert((1L to 20L).map(got).distinct.size === 1) // leaves identical
  }

  test("pageRankInt redistributeDangling: mass conserved within floor slack; drop variant deflates") {
    // star into a SINK: 20 leaves -> 100, 100 -> 101, 101 dangling —
    // the heavy-dangling-tail shape of real web graphs, where the sink
    // swallows the hub's whole contribution each round
    val edges = ((1L to 20L).map(i => (i, 100L)) :+ ((100L, 101L)))
      .toDF("src", "dst")
    val n = 22L
    val scale = 1000000L
    val redis = Graph.pageRankInt(edges, iters = 3,
        redistributeDangling = true)
      .as[(Long, Long)].collect().toMap
    val drop = Graph.pageRankInt(edges, iters = 3)
      .as[(Long, Long)].collect().toMap
    // conservation: total stays within per-round floor-division slack
    // of N*scale (each round loses < 1 unit per edge + per node + the
    // damped remainder of the integer divisions, never gains)
    val total = redis.values.sum
    assert(total <= n * scale, s"total $total must not exceed ${n * scale}")
    assert(total > (n * scale * 99) / 100,
      s"total $total lost more than 1% to floor slack")
    // the drop variant leaks the sink's mass: strictly smaller total,
    // and every node weakly below its redistribute rank
    assert(drop.values.sum < total)
    assert(redis.keySet === drop.keySet)
    redis.keys.foreach(k => assert(redis(k) >= drop(k), s"node $k"))
    // redistribute keeps the ORDER structure (hub > sink > leaves here)
    assert(redis(100L) > redis(101L) && redis(101L) > redis(1L))
  }

  test("pageRankInt seeds: seeds-as-all-nodes degenerates to uniform; trust decays off-seed") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (10L, 11L), (11L, 10L))
      .toDF("src", "dst")
    // seeds = every node -> (N*base) DIV N = base, bit-identical
    val allIds = Seq(1L, 2L, 3L, 10L, 11L).toDF("id")
    val uniform = Graph.pageRankInt(edges, iters = 3)
      .as[(Long, Long)].collect().toMap
    val seededAll = Graph.pageRankInt(edges, iters = 3,
        seeds = Some(allIds))
      .as[(Long, Long)].collect().toMap
    assert(uniform === seededAll)
    // seeds = {1}: the 1->2->3 cycle keeps teleport mass; the {10,11}
    // island receives none and its rank decays geometrically — the
    // TrustRank spam-demotion property
    val seeded = Graph.pageRankInt(edges, iters = 3,
        seeds = Some(Seq(1L).toDF("id")))
      .as[(Long, Long)].collect().toMap
    assert(seeded(1L) > seeded(10L) && seeded(2L) > seeded(10L))
    assert(seeded(10L) === seeded(11L)) // symmetric island
    // island rank after 3 rounds = scale * (d)^3 with floor slack
    assert(seeded(10L) < (1000000L * 85 * 85 * 85) / (100 * 100 * 100) + 1,
      s"unreached island must hold only decayed initial mass: ${seeded(10L)}")
    // total teleport mass conserved onto the seed (within floor slack):
    // seeded total tracks the uniform total
    assert(seeded.values.sum <= uniform.values.sum)
    assert(seeded.values.sum > uniform.values.sum * 98 / 100)
  }

  test("pageRankInt seeds + redistributeDangling: dangling mass teleports to the seeds") {
    // 1 -> 2 -> sink 3; seed {1}; without redistribution 3's mass
    // drains, with it the drained mass lands back on 1
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val seeds = Some(Seq(1L).toDF("id"))
    val drop = Graph.pageRankInt(edges, iters = 3, seeds = seeds)
      .as[(Long, Long)].collect().toMap
    val redis = Graph.pageRankInt(edges, iters = 3, seeds = seeds,
        redistributeDangling = true)
      .as[(Long, Long)].collect().toMap
    assert(redis(1L) > drop(1L), s"seed must receive the dangling mass: $redis vs $drop")
    assert(redis(2L) >= drop(2L) && redis(3L) >= drop(3L))
    // a seed id with no incident edge fails loudly
    val ex = intercept[IllegalArgumentException] {
      Graph.pageRankInt(edges, iters = 1,
        seeds = Some(Seq(999L).toDF("id"))).collect()
    }
    assert(ex.getMessage.contains("seed"))
  }

  test("pageRankInt redistributeDangling: no dangling nodes => identical to drop variant") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val a = Graph.pageRankInt(edges, iters = 3)
      .as[(Long, Long)].collect().toMap
    val b = Graph.pageRankInt(edges, iters = 3, redistributeDangling = true)
      .as[(Long, Long)].collect().toMap
    assert(a === b)
  }
}
