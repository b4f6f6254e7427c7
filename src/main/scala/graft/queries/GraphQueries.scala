package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.Graph
import graft.queries.Q._

/** Graph / fixpoint queries: iterative frontier BFS (the scale path) and
  * the declarative `WITH RECURSIVE` SQL surface (Spark 4 recursive CTEs,
  * which DuckDB mirrors verbatim — the whole query IS its oracle).
  *
  * The synthetic graph lives on `part`: each key points at `key DIV 2`
  * and `key DIV 3` — a DAG whose components span all scale factors, so
  * the queries are non-degenerate at every SF without extra fixtures.
  */
object GraphQueries {

  val queries: Map[String, QFn] = Map(
    // Min-hop BFS from a seed set (every 97th part) over the DIV-2/DIV-3
    // DAG — iterative frontier expansion, O(edges touched) total work.
    // Oracle: DuckDB recursive CTE enumerating ALL paths + MIN(hops) —
    // exponential in path count, which is exactly why the engine side
    // uses BFS instead.
    "q_bfs_hops" -> { (s, dir) =>
      val part = t(s, dir, "part")
      val edges = part.select(col("p_partkey").cast("long").as("src"),
          expr("p_partkey DIV 2").as("dst"))
        .unionByName(part.select(col("p_partkey").cast("long").as("src"),
          expr("p_partkey DIV 3").as("dst")))
        .where(col("dst") > 0)
      val seeds = part.where(col("p_partkey") % 97 === 0)
        .select(col("p_partkey").cast("long").as("id"))
      Graph.bfsHops(edges, seeds)
    },

    // Ancestor-chain rollup via Spark 4's native WITH RECURSIVE: each
    // part walks key -> key DIV 10 -> ... -> 0; per part, the chain
    // depth, length, and ancestor-key sum. Purely declarative recursion
    // — Catalyst plans each step as a join-free self-union, bounded by
    // spark.sql.cteRecursionLevelLimit.
    // Integer PageRank, 3 rounds, over the same DIV-2/DIV-3 DAG — the
    // link-centrality quality signal of web-corpus curation. Integer
    // per-edge floor division makes every round bit-reproducible, so
    // the oracle unrolls all 3 rounds verbatim in SQL (distinct edges:
    // p=3 emits the SAME edge via DIV 2 and DIV 3, hence the distinct).
    "q_pagerank" -> { (s, dir) =>
      val part = t(s, dir, "part")
      val edges = part.select(col("p_partkey").cast("long").as("src"),
          expr("p_partkey DIV 2").as("dst"))
        .unionByName(part.select(col("p_partkey").cast("long").as("src"),
          expr("p_partkey DIV 3").as("dst")))
        .where(col("dst") > 0)
        .distinct()
      Graph.pageRankInt(edges, iters = 3)
    },

    // The DANGLING-REDISTRIBUTE PageRank variant on the same DAG: the
    // round's dangling mass (node 1 is the DAG's one sink) teleports
    // uniformly to every node — exact integer share, so the oracle
    // unrolls all 3 rounds including the per-round mass scalar. On
    // real web graphs (heavy dangling tails) this is the variant a
    // host-quality ranking runs; here the planted sink pins the
    // arithmetic end to end.
    "q_pagerank_redistribute" -> { (s, dir) =>
      val part = t(s, dir, "part")
      val edges = part.select(col("p_partkey").cast("long").as("src"),
          expr("p_partkey DIV 2").as("dst"))
        .unionByName(part.select(col("p_partkey").cast("long").as("src"),
          expr("p_partkey DIV 3").as("dst")))
        .where(col("dst") > 0)
        .distinct()
      Graph.pageRankInt(edges, iters = 3, redistributeDangling = true)
    },

    // PERSONALIZED (TrustRank) PageRank: teleport mass lands only on
    // the seed set (every 97th part — the BFS seeds), so rank flows
    // outward from trusted nodes and unreachable regions decay — the
    // spam-demotion ranking of web curation. Integer per-seed base
    // ((N*base) DIV |S|), unrolled 3-round oracle with the seed CASE.
    "q_pagerank_personalized" -> { (s, dir) =>
      val part = t(s, dir, "part")
      val edges = part.select(col("p_partkey").cast("long").as("src"),
          expr("p_partkey DIV 2").as("dst"))
        .unionByName(part.select(col("p_partkey").cast("long").as("src"),
          expr("p_partkey DIV 3").as("dst")))
        .where(col("dst") > 0)
        .distinct()
      val seeds = part.where(col("p_partkey") % 97 === 0)
        .select(col("p_partkey").cast("long").as("id"))
      Graph.pageRankInt(edges, iters = 3, seeds = Some(seeds))
    },

    "q_recursive_chain" -> { (s, dir) =>
      t(s, dir, "part").createOrReplaceTempView("part")
      s.sql("""
        WITH RECURSIVE anc(p_partkey, anc, depth) AS (
          SELECT p_partkey, p_partkey DIV 10, CAST(1 AS BIGINT) FROM part
          UNION ALL
          SELECT p_partkey, anc DIV 10, depth + 1 FROM anc WHERE anc > 0
        )
        SELECT p_partkey, max(depth) AS depth,
               count(*) AS n_anc, sum(anc) AS sum_anc
        FROM anc GROUP BY p_partkey""")
    })

  val oracles: Map[String, String] = Map(
    "q_bfs_hops" ->
      """WITH RECURSIVE e AS (
        |  SELECT CAST(p_partkey AS BIGINT) AS src,
        |         CAST(p_partkey // 2 AS BIGINT) AS dst
        |  FROM part WHERE p_partkey // 2 > 0
        |  UNION ALL
        |  SELECT CAST(p_partkey AS BIGINT), CAST(p_partkey // 3 AS BIGINT)
        |  FROM part WHERE p_partkey // 3 > 0),
        |r AS (
        |  SELECT CAST(p_partkey AS BIGINT) AS id, CAST(0 AS BIGINT) AS hops
        |  FROM part WHERE p_partkey % 97 = 0
        |  UNION ALL
        |  SELECT e.dst, r.hops + 1 FROM r JOIN e ON e.src = r.id)
        |SELECT id, MIN(hops) AS hops FROM r GROUP BY id""".stripMargin,

    "q_pagerank" ->
      """WITH e AS (
        |  SELECT DISTINCT src, dst FROM (
        |    SELECT CAST(p_partkey AS BIGINT) AS src,
        |           CAST(p_partkey // 2 AS BIGINT) AS dst
        |    FROM part WHERE p_partkey // 2 > 0
        |    UNION ALL
        |    SELECT CAST(p_partkey AS BIGINT), CAST(p_partkey // 3 AS BIGINT)
        |    FROM part WHERE p_partkey // 3 > 0)),
        |deg AS (SELECT src, COUNT(*) AS d FROM e GROUP BY src),
        |nodes AS (SELECT DISTINCT id FROM
        |  (SELECT src AS id FROM e UNION ALL SELECT dst FROM e)),
        |r0 AS (SELECT id, CAST(1000000 AS BIGINT) AS r FROM nodes),
        |c1 AS (SELECT e.dst AS id, SUM((r.r * 85) // (100 * deg.d)) AS c
        |  FROM e JOIN r0 r ON r.id = e.src JOIN deg ON deg.src = e.src
        |  GROUP BY e.dst),
        |r1 AS (SELECT n.id, 150000 + COALESCE(c.c, 0) AS r
        |  FROM nodes n LEFT JOIN c1 c USING (id)),
        |c2 AS (SELECT e.dst AS id, SUM((r.r * 85) // (100 * deg.d)) AS c
        |  FROM e JOIN r1 r ON r.id = e.src JOIN deg ON deg.src = e.src
        |  GROUP BY e.dst),
        |r2 AS (SELECT n.id, 150000 + COALESCE(c.c, 0) AS r
        |  FROM nodes n LEFT JOIN c2 c USING (id)),
        |c3 AS (SELECT e.dst AS id, SUM((r.r * 85) // (100 * deg.d)) AS c
        |  FROM e JOIN r2 r ON r.id = e.src JOIN deg ON deg.src = e.src
        |  GROUP BY e.dst),
        |r3 AS (SELECT n.id, 150000 + COALESCE(c.c, 0) AS r
        |  FROM nodes n LEFT JOIN c3 c USING (id))
        |SELECT id, CAST(r AS BIGINT) AS rank_q FROM r3""".stripMargin,

    "q_pagerank_redistribute" ->
      """WITH e AS (
        |  SELECT DISTINCT src, dst FROM (
        |    SELECT CAST(p_partkey AS BIGINT) AS src,
        |           CAST(p_partkey // 2 AS BIGINT) AS dst
        |    FROM part WHERE p_partkey // 2 > 0
        |    UNION ALL
        |    SELECT CAST(p_partkey AS BIGINT), CAST(p_partkey // 3 AS BIGINT)
        |    FROM part WHERE p_partkey // 3 > 0)),
        |deg AS (SELECT src, COUNT(*) AS d FROM e GROUP BY src),
        |nodes AS (SELECT DISTINCT id FROM
        |  (SELECT src AS id FROM e UNION ALL SELECT dst FROM e)),
        |nn AS (SELECT COUNT(*) AS n FROM nodes),
        |r0 AS (SELECT id, CAST(1000000 AS BIGINT) AS r FROM nodes),
        |d1 AS (SELECT COALESCE(SUM(r.r), 0) AS dm FROM r0 r
        |  LEFT JOIN deg ON deg.src = r.id WHERE deg.src IS NULL),
        |c1 AS (SELECT e.dst AS id, SUM((r.r * 85) // (100 * deg.d)) AS c
        |  FROM e JOIN r0 r ON r.id = e.src JOIN deg ON deg.src = e.src
        |  GROUP BY e.dst),
        |r1 AS (SELECT n.id,
        |    150000 + COALESCE(c.c, 0) + (d1.dm * 85) // (100 * nn.n) AS r
        |  FROM nodes n LEFT JOIN c1 c USING (id) CROSS JOIN d1 CROSS JOIN nn),
        |d2 AS (SELECT COALESCE(SUM(r.r), 0) AS dm FROM r1 r
        |  LEFT JOIN deg ON deg.src = r.id WHERE deg.src IS NULL),
        |c2 AS (SELECT e.dst AS id, SUM((r.r * 85) // (100 * deg.d)) AS c
        |  FROM e JOIN r1 r ON r.id = e.src JOIN deg ON deg.src = e.src
        |  GROUP BY e.dst),
        |r2 AS (SELECT n.id,
        |    150000 + COALESCE(c.c, 0) + (d2.dm * 85) // (100 * nn.n) AS r
        |  FROM nodes n LEFT JOIN c2 c USING (id) CROSS JOIN d2 CROSS JOIN nn),
        |d3 AS (SELECT COALESCE(SUM(r.r), 0) AS dm FROM r2 r
        |  LEFT JOIN deg ON deg.src = r.id WHERE deg.src IS NULL),
        |c3 AS (SELECT e.dst AS id, SUM((r.r * 85) // (100 * deg.d)) AS c
        |  FROM e JOIN r2 r ON r.id = e.src JOIN deg ON deg.src = e.src
        |  GROUP BY e.dst),
        |r3 AS (SELECT n.id,
        |    150000 + COALESCE(c.c, 0) + (d3.dm * 85) // (100 * nn.n) AS r
        |  FROM nodes n LEFT JOIN c3 c USING (id) CROSS JOIN d3 CROSS JOIN nn)
        |SELECT id, CAST(r AS BIGINT) AS rank_q FROM r3""".stripMargin,

    "q_pagerank_personalized" ->
      """WITH e AS (
        |  SELECT DISTINCT src, dst FROM (
        |    SELECT CAST(p_partkey AS BIGINT) AS src,
        |           CAST(p_partkey // 2 AS BIGINT) AS dst
        |    FROM part WHERE p_partkey // 2 > 0
        |    UNION ALL
        |    SELECT CAST(p_partkey AS BIGINT), CAST(p_partkey // 3 AS BIGINT)
        |    FROM part WHERE p_partkey // 3 > 0)),
        |deg AS (SELECT src, COUNT(*) AS d FROM e GROUP BY src),
        |nodes AS (SELECT DISTINCT id FROM
        |  (SELECT src AS id FROM e UNION ALL SELECT dst FROM e)),
        |nn AS (SELECT COUNT(*) AS n FROM nodes),
        |sd AS (SELECT DISTINCT CAST(p_partkey AS BIGINT) AS id FROM part
        |  WHERE p_partkey % 97 = 0),
        |sdn AS (SELECT sd.id FROM sd JOIN nodes USING (id)),
        |bs AS (SELECT (nn.n * 150000) // (SELECT COUNT(*) FROM sdn) AS pb
        |  FROM nn),
        |r0 AS (SELECT id, CAST(1000000 AS BIGINT) AS r FROM nodes),
        |c1 AS (SELECT e.dst AS id, SUM((r.r * 85) // (100 * deg.d)) AS c
        |  FROM e JOIN r0 r ON r.id = e.src JOIN deg ON deg.src = e.src
        |  GROUP BY e.dst),
        |r1 AS (SELECT n.id,
        |    CASE WHEN s.id IS NOT NULL THEN bs.pb ELSE 0 END
        |      + COALESCE(c.c, 0) AS r
        |  FROM nodes n LEFT JOIN sdn s ON s.id = n.id
        |  LEFT JOIN c1 c ON c.id = n.id CROSS JOIN bs),
        |c2 AS (SELECT e.dst AS id, SUM((r.r * 85) // (100 * deg.d)) AS c
        |  FROM e JOIN r1 r ON r.id = e.src JOIN deg ON deg.src = e.src
        |  GROUP BY e.dst),
        |r2 AS (SELECT n.id,
        |    CASE WHEN s.id IS NOT NULL THEN bs.pb ELSE 0 END
        |      + COALESCE(c.c, 0) AS r
        |  FROM nodes n LEFT JOIN sdn s ON s.id = n.id
        |  LEFT JOIN c2 c ON c.id = n.id CROSS JOIN bs),
        |c3 AS (SELECT e.dst AS id, SUM((r.r * 85) // (100 * deg.d)) AS c
        |  FROM e JOIN r2 r ON r.id = e.src JOIN deg ON deg.src = e.src
        |  GROUP BY e.dst),
        |r3 AS (SELECT n.id,
        |    CASE WHEN s.id IS NOT NULL THEN bs.pb ELSE 0 END
        |      + COALESCE(c.c, 0) AS r
        |  FROM nodes n LEFT JOIN sdn s ON s.id = n.id
        |  LEFT JOIN c3 c ON c.id = n.id CROSS JOIN bs)
        |SELECT id, CAST(r AS BIGINT) AS rank_q FROM r3""".stripMargin,

    "q_recursive_chain" ->
      """WITH RECURSIVE anc(p_partkey, anc, depth) AS (
        |  SELECT p_partkey, p_partkey // 10, CAST(1 AS BIGINT) FROM part
        |  UNION ALL
        |  SELECT p_partkey, anc // 10, depth + 1 FROM anc WHERE anc > 0
        |)
        |SELECT p_partkey, MAX(depth) AS depth,
        |       CAST(COUNT(*) AS BIGINT) AS n_anc,
        |       CAST(SUM(anc) AS BIGINT) AS sum_anc
        |FROM anc GROUP BY p_partkey""".stripMargin)
}
