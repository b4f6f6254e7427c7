package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Relational
import Q._

/** Relational operator coverage (SURVEY §2 Part B): aggregation, joins of
  * every flavor, windows, sort/limit/top-k, set ops, distinct, rollup/
  * cube, scalar function families, range/as-of joins, sessionization.
  * Each query has a DuckDB oracle in [[oracles]].
  */
object RelationalQueries {

  val queries: Map[String, QFn] = Map(
    // TPC-H Q1 shape: the canonical scan→filter→hash-agg pipeline.
    // Filter + pruning push to the parquet scan; partial agg map-side.
    "q1_pricing_summary" -> { (s, dir) =>
      val li = t(s, dir, "lineitem")
      li.where(col("l_shipdate") <= tsLit(li, "l_shipdate", "1998-09-02"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sumMoney(money(col("l_quantity"))).as("sum_qty"),
          sumMoney(money(col("l_extendedprice"))).as("sum_base_price"),
          sumMoney(money(col("l_extendedprice")) * oneMinus(col("l_discount"))).as("sum_disc_price"),
          sumMoney(money(col("l_extendedprice")) * oneMinus(col("l_discount")) * onePlus(col("l_tax"))).as("sum_charge"),
          (round(sum(money(col("l_quantity"))), 4).cast("double") / count(lit(1))).as("avg_qty"),
          (round(sum(money(col("l_extendedprice"))), 4).cast("double") / count(lit(1))).as("avg_price"),
          count(lit(1)).as("count_order"))
    },

    // 3-way join + agg + deterministic top-10 (TPC-H Q3 shape).
    // lineitem is the probe side: the filtered customer⋈orders result is
    // small and explicitly broadcast, so the fact table is scanned once
    // with no shuffle and never broadcast (Catalyst's size estimate
    // would otherwise broadcast filtered lineitem — wrong at scale).
    "q3_top_orders" -> { (s, dir) =>
      val c = t(s, dir, "customer").where(col("c_mktsegment") === "BUILDING")
      val o = t(s, dir, "orders")
      val li = t(s, dir, "lineitem")
      val of = o.where(col("o_orderdate") < tsLit(o, "o_orderdate", "1998-01-01"))
      val lf = li.where(col("l_shipdate") > tsLit(li, "l_shipdate", "1998-01-01"))
      val co = c.join(of, col("c_custkey") === col("o_custkey"))
        .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      lf.join(broadcast(co), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(sumMoney(money(col("l_extendedprice")) * oneMinus(col("l_discount"))).as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey").asc)
        .limit(10)
    },

    // 6-way star join (TPC-H Q5 shape). nation/region are broadcast —
    // the only sane plan when lineitem is 100 TB.
    "q5_nation_revenue" -> { (s, dir) =>
      val o = t(s, dir, "orders")
      val cust = t(s, dir, "customer")
      val supp = t(s, dir, "supplier")
      val nat = broadcast(t(s, dir, "nation"))
      val reg = broadcast(t(s, dir, "region").where(col("r_name") === "ASIA"))
      val of = o.where(col("o_orderdate") >= tsLit(o, "o_orderdate", "1996-01-01") &&
        col("o_orderdate") < tsLit(o, "o_orderdate", "1997-01-01"))
      t(s, dir, "lineitem")
        .join(of, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .join(supp, col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .join(nat, col("s_nationkey") === col("n_nationkey"))
        .join(reg, col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(sumMoney(money(col("l_extendedprice")) * oneMinus(col("l_discount"))).as("revenue"))
    },

    // Left outer join preserving customers with zero orders.
    "q_join_left" -> { (s, dir) =>
      t(s, dir, "customer")
        .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("n_orders"),
          round(sum(money(col("o_totalprice"))), 4).cast("double").as("total_spent"))
    },

    // Semi join = EXISTS.
    "q_join_semi" -> { (s, dir) =>
      val fo = t(s, dir, "orders").where(col("o_orderstatus") === "F")
      t(s, dir, "customer")
        .join(fo, col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
    },

    // Anti join = NOT EXISTS.
    "q_join_anti" -> { (s, dir) =>
      val urgent = t(s, dir, "orders").where(col("o_orderpriority") === "1-URGENT")
      t(s, dir, "customer")
        .join(urgent, col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_nationkey"))
    },

    // Right outer join (orders kept even without a matching filtered
    // customer) — completes the outer-join family.
    "q_join_right" -> { (s, dir) =>
      val bigCust = t(s, dir, "customer").where(col("c_acctbal") > 5000)
        .select(col("c_custkey"), col("c_name"))
      t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"))
        .join(bigCust, col("c_custkey") === col("o_custkey"), "right")
        .groupBy(col("c_custkey"), col("c_name"))
        .agg(count(col("o_orderkey")).as("n_orders"))
    },

    // Bag-semantics set ops: EXCEPT ALL / INTERSECT ALL keep
    // multiplicities (the distinct forms are q_set_ops).
    "q_set_ops_all" -> { (s, dir) =>
      val c = t(s, dir, "customer").select(col("c_nationkey").as("k"))
      val sup = t(s, dir, "supplier").select(col("s_nationkey").as("k"))
      c.exceptAll(sup).groupBy(col("k")).agg(count(lit(1)).as("n"))
        .select(lit("except_all").as("op"), col("k"), col("n"))
        .unionAll(
          c.intersectAll(sup).groupBy(col("k")).agg(count(lit(1)).as("n"))
            .select(lit("intersect_all").as("op"), col("k"), col("n")))
    },

    // String aggregation: ordered, delimited concatenation per group
    // (listagg/string_agg) — deterministic via explicit sort.
    "q_string_agg" -> { (s, dir) =>
      t(s, dir, "region")
        .join(t(s, dir, "nation"), col("r_regionkey") === col("n_regionkey"))
        .groupBy(col("r_name"))
        .agg(concat_ws(",", array_sort(collect_list(col("n_name")))).as("nations"),
          count(lit(1)).as("n_nations"))
    },

    // Full outer join of two pre-aggregated sides.
    "q_join_full" -> { (s, dir) =>
      val cc = t(s, dir, "customer").groupBy(col("c_nationkey").as("nk_c"))
        .agg(count(lit(1)).as("n_cust"))
      val sc = t(s, dir, "supplier").groupBy(col("s_nationkey").as("nk_s"))
        .agg(count(lit(1)).as("n_supp"))
      cc.join(sc, col("nk_c") === col("nk_s"), "full_outer")
        .select(coalesce(col("nk_c"), col("nk_s")).as("nationkey"),
          col("n_cust"), col("n_supp"))
    },

    // Window functions: row_number / rank / lag over one shuffle.
    "q_window_rank" -> { (s, dir) =>
      val seqW = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      val priceW = Window.partitionBy(col("o_custkey")).orderBy(col("o_totalprice").desc)
      t(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          row_number().over(seqW).cast("long").as("rn"),
          rank().over(priceW).cast("long").as("rnk"),
          lag(col("o_totalprice"), 1).over(seqW).as("prev_price"))
        .where(col("rn") <= 5)
    },

    // Distribution-rank window family: ntile, percent_rank, cume_dist,
    // first/last value over explicit frames.
    "q_window_dist" -> { (s, dir) =>
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice").asc, col("o_orderkey").asc)
      val wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      t(s, dir, "orders").where(col("o_custkey") < 100)
        .select(col("o_orderpriority"), col("o_orderkey"),
          ntile(4).over(w).cast("long").as("quartile"),
          percent_rank().over(w).as("pct_rank"),
          cume_dist().over(w).as("cume"),
          first(col("o_orderkey")).over(wf).as("cheapest"),
          last(col("o_orderkey")).over(wf).as("priciest"))
    },

    // Running (prefix) aggregate — decimal-exact so the incremental vs
    // segment-tree evaluation strategies of different engines agree.
    "q_window_running" -> { (s, dir) =>
      val w = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("l_shipdate").asc, col("l_orderkey").asc, col("l_linenumber").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "lineitem").where(col("l_suppkey") < 10)
        .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
          round(sum(money(col("l_extendedprice")) * oneMinus(col("l_discount"))).over(w), 4)
            .cast("double").as("running_rev"))
    },

    // RANGE window frame (value-based, not row-based): per supplier,
    // events within the trailing 7-day VALUE window of each ship date —
    // rows at equal order-key values share one frame.
    "q_window_range" -> { (s, dir) =>
      val li = t(s, dir, "lineitem").where(col("l_suppkey") < 20)
        .withColumn("ship_day", datediff(col("l_shipdate"), lit("1992-01-01").cast("date")).cast("long"))
      val w = Window.partitionBy(col("l_suppkey")).orderBy(col("ship_day"))
        .rangeBetween(-6, 0)
      li.select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        col("ship_day"),
        count(lit(1)).over(w).as("n_trailing_7d"),
        sum(money(col("l_quantity"))).over(w).cast("double").as("qty_trailing_7d"))
    },

    // Distribution-rank window family: ntile buckets, percent_rank,
    // cume_dist, nth_value — the remaining ANSI window functions. The
    // (price, key) ordering is a total order, so every value is
    // deterministic; percent_rank/cume_dist are single correctly-
    // rounded divisions of exact ints (bit-stable cross-engine).
    "q_window_ntile" -> { (s, dir) =>
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      t(s, dir, "orders").where(col("o_orderkey") % 7 === 0)
        .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"),
          ntile(8).over(w).cast("long").as("octile"),
          percent_rank().over(w).as("pct_rank"),
          cume_dist().over(w).as("cume"),
          nth_value(col("o_totalprice"), 2)
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .as("second_low"))
    },

    // Burst anomaly detection: user-days whose event count exceeds 2x
    // the user's average daily rate — the comparison is pure integer
    // cross-multiplication (cnt * n_days > 2 * total), no division, so
    // exact on every engine. One shuffle for the daily counts, one
    // window pass for the per-user totals.
    "q_anomaly_bursts" -> { (s, dir) =>
      val daily = events(s, dir)
        .select(col("user_id"), to_date(col("ts")).as("d"))
        .groupBy("user_id", "d").agg(count(lit(1)).as("cnt"))
      val w = Window.partitionBy(col("user_id"))
      daily.select(col("user_id"), col("d"), col("cnt"),
          sum(col("cnt")).over(w).as("total"),
          count(lit(1)).over(w).as("n_days"))
        .where(col("cnt") * col("n_days") > lit(2) * col("total"))
    },

    // Top-k per group: the window-rank idiom (no global sort).
    "q_topk_per_group" -> { (s, dir) =>
      Relational.topKPerGroup(
        t(s, dir, "orders").select(col("o_custkey"), col("o_orderkey"), col("o_totalprice")),
        Seq(col("o_custkey")), Seq(col("o_totalprice").desc, col("o_orderkey").asc), 3)
        .withColumn("rk", col("rk").cast("long"))
    },

    // Top-k per group as a NATIVE bounded aggregate (TopKByScore
    // TypedImperativeAggregate): k-bounded heap buffer, map-side
    // combine, <= k rows per group per map task on the wire — vs the
    // window idiom's full shuffle+sort of every row. Same result set.
    "q_topk_agg" -> { (s, dir) =>
      import org.apache.spark.sql.graft.shim
      val agg = shim.column(graft.functions.expr.TopKByScore(
          shim.expression(col("o_totalprice")),
          shim.expression(col("o_orderkey")), 3)
        .toAggregateExpression())
      t(s, dir, "orders").groupBy(col("o_custkey"))
        .agg(agg.as("top"))
        .select(col("o_custkey"), posexplode(col("top")).as(Seq("i", "e")))
        .select(col("o_custkey"), (col("i") + 1).cast("long").as("rk"),
          col("e.score").as("o_totalprice"), col("e.id").as("o_orderkey"))
    },

    // Global sort + limit → TakeOrderedAndProject (distributed top-k,
    // never a single-partition full sort).
    "q_sort_limit" -> { (s, dir) =>
      t(s, dir, "orders").select(col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(100)
    },

    // Set operations: UNION (distinct) / INTERSECT / EXCEPT.
    "q_set_ops" -> { (s, dir) =>
      val c = t(s, dir, "customer").select(col("c_nationkey").as("k"))
      val sup = t(s, dir, "supplier").select(col("s_nationkey").as("k"))
      c.union(sup).distinct().select(lit("union").as("op"), col("k"))
        .unionAll(c.intersect(sup).select(lit("intersect").as("op"), col("k")))
        .unionAll(c.except(sup).select(lit("except").as("op"), col("k")))
    },

    // Exact distinct counts (expand-based multi-distinct).
    "q_distinct_agg" -> { (s, dir) =>
      t(s, dir, "lineitem").groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_partkey")).as("nd_part"),
          countDistinct(col("l_suppkey")).as("nd_supp"),
          count(lit(1)).as("n"))
    },

    // Skew-resistant salted equi-join: must produce exactly the rows of
    // the plain join (the oracle), while spreading any hot key across
    // 8 sub-partitions.
    "q_salted_join" -> { (s, dir) =>
      import graft.operators.Relational
      val li = t(s, dir, "lineitem")
        .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"))
      val p = t(s, dir, "part").select(col("p_partkey").as("l_partkey"), col("p_brand"))
      Relational.saltedJoin(li, p, "l_partkey", salts = 8)
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n_items"),
          sum(col("l_quantity").cast("decimal(14,6)")).cast("double").as("sum_qty"))
    },

    // HLL sketch distinct (the 100 TB path where exact countDistinct's
    // shuffle is unaffordable). The HLL estimate itself is engine-
    // internal, so the oracle checks it as a PROPERTY: the query emits
    // the exact counts plus a boolean asserting the sketch landed
    // within its documented 5% relative error; the oracle recomputes
    // the exact counts and expects TRUE. A sketch regression (wrong
    // hashing, wrong merge) flips the boolean and fails the hash match.
    "q_approx_distinct" -> { (s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_suppkey")).as("n_supps"),
          approx_count_distinct(col("l_partkey")).as("__apx_p"),
          approx_count_distinct(col("l_suppkey")).as("__apx_s"))
        .select(col("l_returnflag"), col("n_parts"), col("n_supps"),
          (abs(col("__apx_p") - col("n_parts")).cast("double") <=
             col("n_parts") * lit(0.05) &&
           abs(col("__apx_s") - col("n_supps")).cast("double") <=
             col("n_supps") * lit(0.05)).as("apx_ok"))
    },

    // Array functions: per-group collected set (sorted for
    // determinism), size, membership, indexed access.
    "q_array_funcs" -> { (s, dir) =>
      t(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(sort_array(collect_set(col("o_orderstatus"))).as("__statuses"))
        .select(col("o_orderpriority"),
          // serialized (not array-typed) so the driver's pandas-based
          // row sort can hash it — lists are unhashable there
          array_join(col("__statuses"), ",").as("statuses"),
          size(col("__statuses")).cast("long").as("n_statuses"),
          array_contains(col("__statuses"), "F").as("has_f"),
          element_at(col("__statuses"), 1).as("first_status"))
    },

    // Explicit GROUPING SETS through the SQL surface (spark.sql over a
    // temp view) with the grouping_id() indicator — same single-shuffle
    // Expand-based plan as rollup/cube.
    "q_grouping_sets" -> { (s, dir) =>
      t(s, dir, "orders").createOrReplaceTempView("orders_v")
      s.sql("""
        SELECT o_orderstatus, o_orderpriority,
               CAST(grouping_id(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
               COUNT(*) AS n
        FROM orders_v
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())""")
    },

    // Correlated EXISTS subquery (TPC-H Q4 shape) — planned as a left
    // semi join, one shuffle.
    "q_exists_subquery" -> { (s, dir) =>
      val o = t(s, dir, "orders")
      val li = t(s, dir, "lineitem")
        .where(col("l_discount") > 0.05)
        .select(col("l_orderkey"))
      o.where(col("o_orderdate") >= tsLit(o, "o_orderdate", "1996-07-01") &&
          col("o_orderdate") < tsLit(o, "o_orderdate", "1996-10-01"))
        .join(li, col("o_orderkey") === col("l_orderkey"), "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
    },

    // Scalar aggregate subquery (TPC-H Q17 shape): per-part average
    // quantity as the filter bound — planned as an aggregated build
    // side joined back on the key.
    "q_scalar_subquery" -> { (s, dir) =>
      val li = t(s, dir, "lineitem")
      val avgQty = li.groupBy(col("l_partkey").as("ak"))
        .agg((round(sum(money(col("l_quantity"))), 4).cast("double") / count(lit(1)))
          .as("avg_qty"))
      li.join(avgQty, col("l_partkey") === col("ak"))
        .where(col("l_quantity") < lit(0.5) * col("avg_qty"))
        .agg(count(lit(1)).as("n_below"),
          sumMoney(money(col("l_extendedprice"))).as("sum_price"))
    },

    // Pivot: one column per order status, counts + revenue. Plans as a
    // single hash aggregation with conditional aggregates — no extra
    // shuffle vs the flat groupBy.
    "q_pivot" -> { (s, dir) =>
      t(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .withColumnsRenamed(Map("F" -> "n_f", "O" -> "n_o", "P" -> "n_p"))
    },

    // Co-located (bucketed) join: both sides pre-hash-partitioned AND
    // pre-sorted on the key at write time, so the join itself needs
    // ZERO exchanges — how a repeatedly-joined 100 TB fact table
    // amortizes its shuffle once instead of per query (zero-exchange
    // property proven in BucketingSpec; result correctness proven here).
    "q_bucketed_join" -> { (s, dir) =>
      import graft.io.Sources
      Sources.writeBucketed(t(s, dir, "customer")
        .select(col("c_custkey"), col("c_nationkey")), "bk_cust_q", "c_custkey", 8)
      Sources.writeBucketed(t(s, dir, "orders")
        .select(col("o_custkey").as("c_custkey"), col("o_totalprice")),
        "bk_ord_q", "c_custkey", 8)
      s.table("bk_cust_q").join(s.table("bk_ord_q"), "c_custkey")
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("n_orders"),
          round(sum(money(col("o_totalprice"))), 4).cast("double").as("total"))
    },

    // Typed cogroup (the generalized MapReduce contract over TWO
    // inputs): per-key custom fold across both sides in one function.
    "q_cogroup" -> { (s, dir) =>
      import s.implicits._
      val cust = t(s, dir, "customer")
        .select(col("c_custkey"), col("c_nationkey"))
        .as[(Long, Long)].groupByKey(_._1)
      val ord = t(s, dir, "orders")
        .select(col("o_custkey"), col("o_totalprice"))
        .as[(Long, Double)].groupByKey(_._1)
      cust.cogroup(ord) { (key, cs, os) =>
        val nation = cs.map(_._2).toSeq.headOption
        val prices = os.map(_._2).toArray
        nation.map(n => (key, n, prices.length.toLong,
          if (prices.isEmpty) 0.0 else prices.max)).iterator
      }.toDF("c_custkey", "c_nationkey", "n_orders", "max_price")
    },

    // Correlated LATERAL subquery (SQL surface): per-customer top-1
    // order — planned as a DomainJoin rewrite into a window/join, no
    // per-row re-execution.
    "q_lateral_topn" -> { (s, dir) =>
      t(s, dir, "customer").createOrReplaceTempView("cust_lat_v")
      t(s, dir, "orders").createOrReplaceTempView("ord_lat_v")
      s.sql("""
        SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
        FROM cust_lat_v c, LATERAL (
          SELECT o_orderkey, o_totalprice FROM ord_lat_v o
          WHERE o.o_custkey = c.c_custkey
          ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 1) t""")
    },

    // Map-typed columns: build a priority->count map per status, then
    // map lookups / cardinality / value-fold. Missing key => null.
    "q_map_funcs" -> { (s, dir) =>
      t(s, dir, "orders")
        .groupBy(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
        .groupBy(col("o_orderstatus"))
        .agg(map_from_entries(collect_list(struct(col("o_orderpriority"), col("n"))))
          .as("m"))
        .select(col("o_orderstatus"),
          size(col("m")).cast("long").as("n_priorities"),
          element_at(col("m"), "1-URGENT").as("n_urgent"),
          aggregate(map_values(col("m")), lit(0L), (a, v) => a + v).as("n_total"))
    },

    // Deterministic hash-based sampling (~25% by md5 prefix): the
    // training-data subsampling primitive — reproducible, shuffle-free,
    // engine-independent row selection.
    "q_sample_hash" -> { (s, dir) =>
      Relational.deterministicSample(t(s, dir, "orders"), col("o_orderkey"), 0.25)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderpriority"))
    },

    // Exact-count uniform sample: exactly 500 orders — the 500 with
    // the globally smallest 48-bit md5-of-key prefixes, found by a
    // map-side hash-threshold scan + a sort of only the surviving
    // sliver (never a global sort). Pure md5 arithmetic -> the oracle
    // replays the identical 500 rows.
    "q_sample_exact_n" -> { (s, dir) =>
      Relational.sampleExactN(t(s, dir, "orders"), col("o_orderkey"), 500)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    },

    // STRATIFIED exact-count sample: exactly 100 orders per priority
    // class, via ONE pass through the k-bounded heap aggregate
    // (map-side partial heaps, <= n rows per stratum per map task on
    // the wire — never a rank window's full shuffle+sort). Payload
    // re-attached by joining the tiny pick set back on the key.
    "q_sample_stratified" -> { (s, dir) =>
      val o = t(s, dir, "orders")
      Relational.sampleStratifiedN(o, col("o_orderpriority"),
          col("o_orderkey"), 100, keyName = "o_orderkey")
        .join(o.select("o_orderkey", "o_custkey", "o_totalprice"),
          "o_orderkey")
        .select(col("stratum").as("o_orderpriority"), col("rk"),
          col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    },

    // Unpivot (wide -> long): melt the pivoted status counts back into
    // rows — Dataset.unpivot, the inverse of q_pivot's conditional aggs.
    "q_unpivot" -> { (s, dir) =>
      val wide = t(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .withColumnsRenamed(Map("F" -> "n_f", "O" -> "n_o", "P" -> "n_p"))
      wide.unpivot(Array(col("o_orderpriority")),
        Array(col("n_f"), col("n_o"), col("n_p")), "status_col", "n")
    },

    // Fixed-width value histogram (binning): floor-division bin ids are
    // IEEE-exact cross-engine; min/max per bin come straight from
    // storage. One partial-agg shuffle.
    "q_histogram" -> { (s, dir) =>
      t(s, dir, "orders")
        .groupBy(floor(col("o_totalprice") / 60000).cast("long").as("bin"))
        .agg(count(lit(1)).as("n"),
          min(col("o_totalprice")).as("lo"), max(col("o_totalprice")).as("hi"))
    },

    // Approximate percentiles (GK sketch) — the 100 TB path where exact
    // percentile's full sort per group is unaffordable. The sketch
    // value is engine-internal, so the oracle checks the documented
    // rank-error guarantee as a property: with accuracy 1000 the
    // estimate must sit within the exact [q-0.01, q+0.01] quantile
    // envelope; the query emits the exact interpolated percentiles plus
    // the envelope boolean, the oracle recomputes the exact side and
    // expects TRUE.
    "q_approx_percentile" -> { (s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(expr("percentile(l_quantity, 0.5)").as("p50"),
          expr("percentile(l_quantity, 0.9)").as("p90"),
          expr("approx_percentile(l_quantity, 0.5, 1000)").as("__ap50"),
          expr("approx_percentile(l_quantity, 0.9, 1000)").as("__ap90"),
          expr("percentile(l_quantity, 0.49)").as("__lo50"),
          expr("percentile(l_quantity, 0.51)").as("__hi50"),
          expr("percentile(l_quantity, 0.89)").as("__lo90"),
          expr("percentile(l_quantity, 0.91)").as("__hi90"))
        .select(col("l_returnflag"), col("p50"), col("p90"),
          (col("__ap50") >= col("__lo50") && col("__ap50") <= col("__hi50") &&
           col("__ap90") >= col("__lo90") && col("__ap90") <= col("__hi90"))
            .as("apx_ok"))
    },

    // Exact interpolated percentiles (median / p90) per group. Integral
    // quantities make the interpolation arithmetic exact cross-engine.
    "q_percentile" -> { (s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(expr("percentile(l_quantity, 0.5)").as("p50"),
          expr("percentile(l_quantity, 0.9)").as("p90"),
          min(col("l_quantity")).as("qmin"),
          max(col("l_quantity")).as("qmax"))
    },

    // Numeric distribution drift: per-event-type deciles of the
    // (fixed-point) value column compared between the even- and
    // odd-event_id halves of the stream — the feature-distribution
    // monitor gating a new ingest, numeric twin of q_term_drift.
    "q_quantile_drift" -> { (s, dir) =>
      val e = events(s, dir).select(col("event_type"), col("event_id"),
        expr("CAST(FLOOR(value * 1000) AS BIGINT)").as("vq"))
      graft.operators.Timeseries.quantileDrift(
        e.where(col("event_id") % 2 === 0),
        e.where(col("event_id") % 2 === 1), "event_type")
    },

    // ROLLUP grouping sets.
    "q_rollup_agg" -> { (s, dir) =>
      t(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), sumMoney(money(col("l_quantity"))).as("sum_qty"))
    },

    // CUBE grouping sets.
    "q_cube_agg" -> { (s, dir) =>
      t(s, dir, "orders")
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          round(sum(money(col("o_totalprice"))), 4).cast("double").as("total"))
    },

    // Scalar function families: string / math / conditional — all
    // whole-stage-codegen row ops.
    "q_scalar_funcs" -> { (s, dir) =>
      t(s, dir, "lineitem").where(col("l_orderkey") < 500)
        .select(col("l_orderkey"), col("l_linenumber"),
          upper(col("l_returnflag")).as("flag_u"),
          concat(col("l_returnflag"), lit("-"), col("l_linestatus")).as("tag"),
          substring(col("l_linestatus"), 1, 1).as("status1"),
          length(col("l_returnflag")).cast("long").as("flag_len"),
          abs(col("l_extendedprice") - col("l_quantity") * lit(100.0)).as("price_dev"),
          floor(col("l_extendedprice")).cast("long").as("price_floor"),
          ceil(col("l_discount") * lit(100.0)).cast("long").as("disc_pct_ceil"),
          when(col("l_quantity") > 25, lit("big")).otherwise(lit("small")).as("qty_class"),
          coalesce(nullif(col("l_returnflag"), lit("N")), lit("none")).as("flag_or_none"))
    },

    // Date/time extraction + aggregation.
    "q_datetime_agg" -> { (s, dir) =>
      t(s, dir, "orders")
        .groupBy(year(col("o_orderdate")).cast("long").as("yr"),
          month(col("o_orderdate")).cast("long").as("mo"))
        .agg(count(lit(1)).as("n_orders"),
          round(sum(money(col("o_totalprice"))), 4).cast("double").as("total"))
    },

    // JSON extraction from a string column.
    "q_json_events" -> { (s, dir) =>
      events(s, dir)
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy(col("event_type"))
        .agg(sum(col("k")).as("sum_k"), count(lit(1)).as("n"))
    },

    // SCD2 temporal join: facts joined to the dimension VERSION valid
    // at fact time. Dimension history = 3 versions per supplier with
    // contiguous validity windows; the join is the native as-of
    // operator (sort-merge, O(1) memory per partition) — the scale-safe
    // plan for effective-dated dimensions, vs the O(|l|·|r|)-per-key
    // BETWEEN join. Oracle: the windows tile time, so the valid version
    // has the closed form least(ship_day DIV 800, 2).
    "q_scd2_join" -> { (s, dir) =>
      val facts = t(s, dir, "lineitem")
        .select(col("l_suppkey").cast("long").as("k"),
          datediff(col("l_shipdate"), lit("1992-01-01").cast("date"))
            .cast("long").as("t"),
          col("l_returnflag"), col("l_quantity"))
      val dim = t(s, dir, "supplier")
        .select(col("s_suppkey").cast("long").as("k"),
          explode(array(lit(0L), lit(1L), lit(2L))).as("ver"),
          floor(col("s_acctbal")).cast("long").as("bal0"))
        .select(col("k"), (col("ver") * 800).as("t"), col("ver"),
          (col("bal0") + col("ver")).as("bal_v"))
      Relational.asOfNative(facts, dim, "k", "t", Seq("ver", "bal_v"))
        .groupBy(col("l_returnflag"), col("ver"))
        .agg(count(lit(1)).as("n"),
          sumMoney(money(col("l_quantity"))).as("sum_qty"),
          sum(col("bal_v")).as("sum_bal"))
    },

    // ANSI-safe try_* family: division by zero, bad casts, and
    // out-of-bounds array access yield NULL instead of failing the job
    // — the per-row error-tolerance a dirty-corpus pipeline needs under
    // ANSI mode.
    "q_try_funcs" -> { (s, dir) =>
      t(s, dir, "lineitem").where(col("l_orderkey") % 97 === 0)
        .select(col("l_orderkey"), col("l_linenumber").cast("long").as("ln"),
          expr("try_divide(CAST(floor(l_quantity * 100) AS BIGINT), " +
            "CAST(l_linenumber - 1 AS BIGINT))").as("qpd"),
          expr("try_cast(CASE WHEN l_linenumber % 2 = 0 " +
            "THEN CAST(l_linenumber AS STRING) ELSE l_returnflag END AS BIGINT)")
            .as("maybe_int"),
          expr("try_element_at(array(l_returnflag, l_linestatus), 3)")
            .as("oob"))
    },

    // Catalog SQL UDFs (Spark 4 CREATE FUNCTION ... RETURN): a scalar
    // charge function and a TABLE function, both resolved by Catalyst
    // into plain expressions/plans — zero closure shipping, full
    // codegen, unlike JVM UDFs. Oracle: the inlined expressions.
    "q_sql_udf" -> { (s, dir) =>
      t(s, dir, "lineitem").createOrReplaceTempView("lineitem")
      s.sql("""CREATE OR REPLACE TEMPORARY FUNCTION charge(
              |  p DOUBLE, d DOUBLE, t DOUBLE) RETURNS DECIMAL(18,8)
              |RETURN CAST(p AS DECIMAL(14,6)) * CAST(1.0 - d AS DECIMAL(8,6))""".stripMargin)
      s.sql("""CREATE OR REPLACE TEMPORARY FUNCTION flags()
              |RETURNS TABLE(f STRING)
              |RETURN SELECT explode(array('A', 'R'))""".stripMargin)
      s.sql("""SELECT l_returnflag, COUNT(*) AS n,
              |  CAST(ROUND(SUM(charge(l_extendedprice, l_discount, l_tax)), 4)
              |    AS DOUBLE) AS sum_charge
              |FROM lineitem
              |WHERE l_returnflag IN (SELECT f FROM flags())
              |GROUP BY l_returnflag""".stripMargin)
    },

    // approx_top_k with the tracker sized past the NDV: the sketch
    // degenerates to exact counts (deterministic, oracle-checkable) —
    // the same candidates-cover-truth trick as the heavy-hitter paths.
    "q_approx_topk" -> { (s, dir) =>
      t(s, dir, "lineitem").createOrReplaceTempView("lineitem")
      s.sql("""SELECT t.item AS l_returnflag, t.count AS cnt FROM (
              |  SELECT explode(approx_top_k(l_returnflag, 5, 1000)) AS t
              |  FROM lineitem)""".stripMargin)
    },

    // Null-safe equi-join (<=>): NULL keys match NULL — the join
    // variant plain equality silently drops.
    "q_nullsafe_join" -> { (s, dir) =>
      val a = t(s, dir, "lineitem")
        .select(expr("nullif(l_linestatus, 'O')").as("k"), col("l_quantity"))
      val b = a.select(col("k")).distinct().withColumnRenamed("k", "bk")
      a.join(b, a("k") <=> col("bk"))
        .groupBy(col("bk"))
        .agg(count(lit(1)).as("n"), sumMoney(money(col("l_quantity"))).as("sum_qty"))
    },

    // Deterministic per-group reservoir: exactly k rows per group,
    // chosen by md5 order — reproducible group-stratified sampling,
    // composed from the bounded top-k window idiom.
    "q_group_sample" -> { (s, dir) =>
      val w = Window.partitionBy(col("o_orderpriority"), col("o_orderstatus"))
        .orderBy(md5(col("o_orderkey").cast("string")), col("o_orderkey"))
      t(s, dir, "orders")
        .select(col("o_orderpriority"), col("o_orderstatus"), col("o_orderkey"))
        .withColumn("rk", row_number().over(w))
        .where(col("rk") <= 2)
        .select(col("o_orderpriority"), col("o_orderstatus"), col("o_orderkey"),
          col("rk").cast("long").as("rk"))
    },

    // Per-group winsorization: prices clipped to exact [p05, p95];
    // group stats over the damped values. Bounds broadcast; clip is
    // map-side.
    "q_winsorize" -> { (s, dir) =>
      Relational.winsorize(t(s, dir, "lineitem"), "l_returnflag",
          "l_extendedprice", 0.05, 0.95)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          sumMoney(money(col("l_extendedprice_w"))).as("sum_w"),
          sum(when(col("l_extendedprice") < col("l_extendedprice_w"), 1L)
            .otherwise(0L)).as("n_lo"),
          sum(when(col("l_extendedprice") > col("l_extendedprice_w"), 1L)
            .otherwise(0L)).as("n_hi"))
    },

    // Interval-overlap self join on a bucket grid: every pair of
    // overlapping order "activity windows" without an O(n^2) inequality
    // join — the grid turns it into an equi-join, and the later-start
    // ownership rule dedups without a distinct. Oracle: the brute-force
    // inequality join.
    "q_interval_overlap" -> { (s, dir) =>
      val iv = t(s, dir, "orders").where(col("o_orderkey") % 50 === 0)
        .select(col("o_orderkey").cast("long").as("id"),
          datediff(col("o_orderdate"), lit("1992-01-01").cast("date"))
            .cast("long").as("start"))
        .withColumn("end", col("start") + col("id") % 30)
      Relational.intervalOverlapPairs(iv, bucket = 32)
    },

    // Event-transition matrix (first-order Markov counts): per user,
    // consecutive event-type pairs under a (ts, event_id) total order —
    // the clickstream path-analysis primitive. One shuffle on user_id.
    "q_event_transitions" -> { (s, dir) =>
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      events(s, dir)
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
        .withColumn("next_type", lead(col("event_type"), 1).over(w))
        .where(col("next_type").isNotNull)
        .groupBy(col("event_type"), col("next_type"))
        .agg(count(lit(1)).as("n"))
    },

    // Deterministic 80/10/10 train/val/test split: each event's split
    // is a pure md5 function of its id — reproducible, shuffle-free,
    // re-derivable at any scale. Per-(event_type, split) counts.
    "q_split_assign" -> { (s, dir) =>
      Relational.splitAssign(events(s, dir), col("event_id"),
          Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
        .groupBy(col("event_type"), col("split"))
        .agg(count(lit(1)).as("n"))
    },

    // Mergeable HLL sketch rollup (DataSketches): daily distinct-user
    // sketches union into weekly estimates without rescanning events.
    // The estimate is engine-internal, so the oracle checks it as a
    // property: the query joins the rollup against the exact weekly
    // distinct count and emits (exact count, n_buckets, within-5%
    // boolean); the oracle recomputes the exact side and expects TRUE.
    // Union-equals-direct and error bounds are asserted in
    // SketchTextSpec.
    "q_hll_rollup" -> { (s, dir) =>
      val daily = graft.operators.Sketches.hllBuckets(
        events(s, dir), to_date(col("ts")), col("user_id"))
      val rolled = graft.operators.Sketches.hllRollup(daily,
        date_trunc("week", col("bucket")).cast("date"))
      val exact = events(s, dir)
        .groupBy(date_trunc("week", to_date(col("ts"))).cast("date").as("grain"))
        .agg(countDistinct(col("user_id")).as("n_exact"))
      rolled.join(exact, "grain")
        .select(col("grain"), col("n_exact"), col("n_buckets"),
          (abs(col("est_distinct") - col("n_exact")) <=
            col("n_exact").cast("double") * lit(0.05)).as("est_ok"))
    },

    // Semi-structured VARIANT path (Spark 4's binary JSON encoding —
    // parse once, typed path extraction at column speed, no per-access
    // re-parse like get_json_object): props parsed to a variant, k
    // pulled out typed, a missing path proving null-safe try-access.
    "q_variant_events" -> { (s, dir) =>
      events(s, dir)
        .select(col("event_type"),
          expr("variant_get(parse_json(props), '$.k', 'long')").as("k"),
          expr("try_variant_get(parse_json(props), '$.missing', 'long')").as("miss"))
        .groupBy(col("event_type"))
        .agg(sum(col("k")).as("sum_k"),
          count(col("miss")).as("n_missing_hits"),
          count(lit(1)).as("n"))
    },

    // Native XML round-trip (Spark 4 built-in to_xml/from_xml): encode
    // a row to XML, parse it back with an explicit schema, and return
    // the extracted fields — the oracle is the plain projection, so any
    // encode/parse infidelity (including double formatting) fails the
    // bit-exact compare.
    "q_xml_roundtrip" -> { (s, dir) =>
      t(s, dir, "orders").where(col("o_orderkey") % 13 === 0)
        .select(expr("to_xml(named_struct('k', o_orderkey, 'p', o_orderpriority, 'tp', o_totalprice))").as("xml"))
        .select(expr("from_xml(xml, 'k BIGINT, p STRING, tp DOUBLE')").as("r"))
        .select(col("r.k").as("o_orderkey"), col("r.p").as("o_orderpriority"),
          col("r.tp").as("o_totalprice"))
    },

    // Range (band) join: fact column into broadcast [lo,hi) buckets.
    "q_range_join_bands" -> { (s, dir) =>
      val bands = s.createDataFrame(Seq(
        (0, 900.0, 925.0), (1, 925.0, 950.0), (2, 950.0, 975.0), (3, 975.0, 1000.0)))
        .toDF("band_id", "lo", "hi")
      Relational.bandJoin(t(s, dir, "part"), "p_retailprice", bands)
        .groupBy(col("band_id"))
        .agg(count(lit(1)).as("n_parts"),
          round(sum(money(col("p_retailprice"))), 4).cast("double").as("sum_price"))
    },

    // As-of join: each purchase ↔ latest signup at-or-before it, per
    // user. Union+window plan: one shuffle, no range-join explosion.
    "q_asof_join" -> { (s, dir) =>
      val ev = events(s, dir)
      val purchases = ev.where(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id").as("purchase_id"))
      val signups = ev.where(col("event_type") === "signup")
        .select(col("user_id"), col("ts"), col("event_id").as("signup_id"))
      Relational.asOfBackward(purchases, signups, "user_id", "ts",
        leftCols = Seq("purchase_id"), carryCols = Seq("signup_id"))
        .select(col("purchase_id"), col("user_id"), col("signup_id"))
    },

    // FORWARD as-of: each signup's NEXT purchase at/after it — the
    // mirror window (first over [current, following]).
    "q_asof_forward" -> { (s, dir) =>
      val ev = events(s, dir)
      val purchases = ev.where(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id").as("purchase_id"))
      val signups = ev.where(col("event_type") === "signup")
        .select(col("user_id"), col("ts"), col("event_id").as("signup_id"))
      Relational.asOfForward(signups, purchases, "user_id", "ts",
        leftCols = Seq("signup_id"), carryCols = Seq("purchase_id"))
        .select(col("signup_id"), col("user_id"), col("purchase_id"))
    },

    // Deterministic weighted Bernoulli sample: keep probability scales
    // with a per-row quality proxy (here doc length), decided by md5 —
    // reproducible quality-weighted corpus subsampling.
    "q_weighted_sample" -> { (s, dir) =>
      val docs = t(s, dir, "documents")
      Relational.weightedSample(docs, col("doc_id"),
          (length(col("text")) % 128).cast("long") * 512)
        .select(col("doc_id"), length(col("text")).cast("long").as("n_chars"))
    },

    // Same as-of semantics through the NATIVE custom operator
    // (LogicalPlan + SparkStrategy + sort-merge SparkPlan) — one
    // shuffle per side, O(1) merge memory.
    "q_asof_native" -> { (s, dir) =>
      val ev = events(s, dir)
      val purchases = ev.where(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id").as("purchase_id"))
      val signups = ev.where(col("event_type") === "signup")
        .select(col("user_id"), col("ts"), col("event_id").as("signup_id"))
      Relational.asOfNative(purchases, signups, "user_id", "ts",
        carryCols = Seq("signup_id"))
        .select(col("purchase_id"), col("user_id"), col("signup_id"))
    },

    // Gap-based sessionization (30 min).
    "q_sessionize" -> { (s, dir) =>
      Relational.sessionCounts(events(s, dir), "user_id", "ts", "event_id", 1800)
    },

    // MERGE / CDC upsert: latest event value per user applied to the
    // customer table (keys shifted so both MATCHED-update and
    // NOT-MATCHED-insert branches fire). One full-outer shuffle join.
    "q_merge_upsert" -> { (s, dir) =>
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").desc, col("event_id").desc)
      val source = events(s, dir)
        .withColumn("rn", row_number().over(w)).where(col("rn") === 1)
        .select((col("user_id") + 1400).as("c_custkey"),
          col("value").as("c_acctbal"))
      Relational.mergeUpsert(t(s, dir, "customer"), source,
        "c_custkey", Seq("c_acctbal"))
    },

    // Dense hourly grid with zero-filled gaps (215 real gaps at sf0.01).
    "q_gap_fill" -> { (s, dir) =>
      graft.operators.Timeseries.gapFillHourlyCounts(events(s, dir))
    },

    // Last-observation-carried-forward on a dense per-user daily grid.
    "q_ffill" -> { (s, dir) =>
      graft.operators.Timeseries.forwardFillDaily(events(s, dir))
    },

    // Bloom-filter runtime pre-filter + exact semi join: lineitem rows
    // whose supplier is in a ~1/7 build-side subset (key-modulus pick:
    // non-empty at every SF), aggregated. Result is exactly the plain
    // semi join (Bloom FPs removed).
    "q_bloom_join" -> { (s, dir) =>
      val build = t(s, dir, "supplier").where(col("s_suppkey") % 7 === 0)
        .select(col("s_suppkey"))
      Relational.bloomSemiJoin(t(s, dir, "lineitem"), "l_suppkey",
          build, "s_suppkey", expectedKeys = 10000L)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          sumMoney(money(col("l_quantity"))).as("sum_qty"))
    },

    // PII-style masking/anonymization: digits in the JSON props blanked
    // out, with a per-row redaction count — pure map-side expressions.
    "q_redact" -> { (s, dir) =>
      events(s, dir).select(col("event_id"),
        regexp_replace(col("props"), "[0-9]", "#").as("props_masked"),
        (length(col("props")) -
          length(regexp_replace(col("props"), "[0-9]", "")))
          .cast("long").as("n_redacted"))
    },

    // Funnel analysis: the ordered signup → click → purchase milestones
    // per user (each stage's timestamp is the EARLIEST occurrence after
    // the previous stage). Three stage aggregates, each a partial-agg'd
    // shuffle on user_id joined back — funnel depth scales linearly,
    // never a per-user sort of the whole event log.
    "q_funnel" -> { (s, dir) =>
      val e = events(s, dir).select(col("user_id"), col("ts"), col("event_type"))
      val s1 = e.where(col("event_type") === "signup")
        .groupBy("user_id").agg(min(col("ts")).as("t_signup"))
      val s2 = e.where(col("event_type") === "click")
        .join(s1, "user_id").where(col("ts") > col("t_signup"))
        .groupBy("user_id").agg(min(col("ts")).as("t_click"))
      val s3 = e.where(col("event_type") === "purchase")
        .join(s2, "user_id").where(col("ts") > col("t_click"))
        .groupBy("user_id").agg(min(col("ts")).as("t_purchase"))
      s1.join(s2, Seq("user_id"), "left").join(s3, Seq("user_id"), "left")
        .select(col("user_id"), col("t_signup"), col("t_click"), col("t_purchase"),
          (lit(1L) + when(col("t_click").isNotNull, 1L).otherwise(0L)
            + when(col("t_purchase").isNotNull, 1L).otherwise(0L)).as("stage"))
    },

    // Cohort retention: users grouped by first-seen day, activity
    // counted per day-offset — the (cohort, offset) retention matrix.
    "q_cohort" -> { (s, dir) =>
      val e = events(s, dir).select(col("user_id"), to_date(col("ts")).as("d"))
      val cohorts = e.groupBy("user_id").agg(min(col("d")).as("cohort_day"))
      e.join(cohorts, "user_id")
        .groupBy(col("cohort_day"),
          datediff(col("d"), col("cohort_day")).cast("long").as("day_offset"))
        .agg(countDistinct(col("user_id")).as("n_users"))
    },

    // Correlation / covariance per group, bit-stable: the moment sums
    // are exact BIGINTs over quantized values (quantity x100 <= 5e3,
    // price x1 <= 1e5 — squares sum far below 2^63 at any realistic
    // SF), and the final Pearson/covariance formula is a fixed sequence
    // of correctly-rounded double ops — identical on every engine.
    "q_corr" -> { (s, dir) =>
      val li = t(s, dir, "lineitem")
      val x = floor(col("l_quantity") * 100).cast("long")
      val y = floor(col("l_extendedprice")).cast("long")
      val d = (c: org.apache.spark.sql.Column) => c.cast("double")
      val g = li.select(col("l_returnflag"), x.as("x"), y.as("y"))
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("y") * col("y")).as("syy"),
          sum(col("x") * col("y")).as("sxy"))
      g.select(col("l_returnflag"), col("n"),
        ((d(col("n")) * d(col("sxy")) - d(col("sx")) * d(col("sy"))) /
          (sqrt(d(col("n")) * d(col("sxx")) - d(col("sx")) * d(col("sx"))) *
           sqrt(d(col("n")) * d(col("syy")) - d(col("sy")) * d(col("sy")))))
          .as("corr_q"),
        ((d(col("n")) * d(col("sxy")) - d(col("sx")) * d(col("sy"))) /
          (d(col("n")) * d(col("n")))).as("covar_q"))
    },

    // Data profiling: per-column null/distinct/min/max summary in ONE
    // scan (multi-aggregate + driver-side melt of the single agg row).
    "q_profile" -> { (s, dir) =>
      val cols = Seq("l_quantity", "l_extendedprice", "l_discount")
      val li = t(s, dir, "lineitem")
      val aggs = count(lit(1)).as("n_rows") +: cols.flatMap(c => Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}_nulls"),
        countDistinct(col(c)).as(s"${c}_ndv"),
        min(col(c)).as(s"${c}_min"),
        max(col(c)).as(s"${c}_max")))
      // the 1-row aggregate feeds three union branches — persist so the
      // scan+agg runs once, not per branch
      val one = li.agg(aggs.head, aggs.tail: _*).persist()
      cols.map(c => one.select(lit(c).as("col_name"), col("n_rows"),
          col(s"${c}_nulls").as("n_null"), col(s"${c}_ndv").as("n_distinct"),
          col(s"${c}_min").as("min_v"), col(s"${c}_max").as("max_v")))
        .reduce(_ union _)
    })

  val oracles: Map[String, String] = Map(
    "q1_pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  ${sqlSumMoney(sqlMoney("l_quantity"))} AS sum_qty,
         |  ${sqlSumMoney(SQL_MONEY_EXT)} AS sum_base_price,
         |  ${sqlSumMoney(SQL_REVENUE)} AS sum_disc_price,
         |  ${sqlSumMoney(s"$SQL_REVENUE * $SQL_TAX_FACTOR")} AS sum_charge,
         |  CAST(ROUND(SUM(${sqlMoney("l_quantity")}), 4) AS DOUBLE) / COUNT(*) AS avg_qty,
         |  CAST(ROUND(SUM($SQL_MONEY_EXT), 4) AS DOUBLE) / COUNT(*) AS avg_price,
         |  COUNT(*) AS count_order
         |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
         |GROUP BY l_returnflag, l_linestatus""".stripMargin,

    "q3_top_orders" ->
      s"""SELECT l_orderkey, o_orderdate, o_orderpriority,
         |  ${sqlSumMoney(SQL_REVENUE)} AS revenue
         |FROM customer JOIN orders ON c_custkey = o_custkey
         |JOIN lineitem ON l_orderkey = o_orderkey
         |WHERE c_mktsegment = 'BUILDING'
         |  AND o_orderdate < TIMESTAMP '1998-01-01'
         |  AND l_shipdate > TIMESTAMP '1998-01-01'
         |GROUP BY l_orderkey, o_orderdate, o_orderpriority
         |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,

    "q5_nation_revenue" ->
      s"""SELECT n_name, ${sqlSumMoney(SQL_REVENUE)} AS revenue
         |FROM customer, orders, lineitem, supplier, nation, region
         |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
         |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
         |  AND r_name = 'ASIA'
         |  AND o_orderdate >= TIMESTAMP '1996-01-01'
         |  AND o_orderdate < TIMESTAMP '1997-01-01'
         |GROUP BY n_name""".stripMargin,

    "q_join_left" ->
      s"""SELECT c_custkey, COUNT(o_orderkey) AS n_orders,
         |  ${sqlSumMoney(sqlMoney("o_totalprice"))} AS total_spent
         |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
         |GROUP BY c_custkey""".stripMargin,

    "q_join_semi" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderstatus = 'F')""".stripMargin,

    "q_join_anti" ->
      """SELECT c_custkey, c_nationkey FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')""".stripMargin,

    "q_join_full" ->
      """WITH cc AS (SELECT c_nationkey AS nk, COUNT(*) AS n_cust FROM customer GROUP BY 1),
        |     sc AS (SELECT s_nationkey AS nk, COUNT(*) AS n_supp FROM supplier GROUP BY 1)
        |SELECT COALESCE(cc.nk, sc.nk) AS nationkey, n_cust, n_supp
        |FROM cc FULL OUTER JOIN sc ON cc.nk = sc.nk""".stripMargin,

    "q_window_rank" ->
      """SELECT o_custkey, o_orderkey, rn, rnk, prev_price FROM (
        |  SELECT o_custkey, o_orderkey,
        |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn,
        |    rank() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC) AS rnk,
        |    lag(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_price
        |  FROM orders) WHERE rn <= 5""".stripMargin,

    "q_window_dist" ->
      """SELECT o_orderpriority, o_orderkey,
        |  CAST(ntile(4) OVER w AS BIGINT) AS quartile,
        |  percent_rank() OVER w AS pct_rank,
        |  cume_dist() OVER w AS cume,
        |  first_value(o_orderkey) OVER wf AS cheapest,
        |  last_value(o_orderkey) OVER wf AS priciest
        |FROM orders WHERE o_custkey < 100
        |WINDOW w AS (PARTITION BY o_orderpriority
        |             ORDER BY o_totalprice ASC, o_orderkey ASC),
        |       wf AS (PARTITION BY o_orderpriority
        |             ORDER BY o_totalprice ASC, o_orderkey ASC
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)""".stripMargin,

    "q_window_running" ->
      s"""SELECT l_suppkey, l_orderkey, l_linenumber,
         |  CAST(ROUND(SUM($SQL_REVENUE) OVER (
         |    PARTITION BY l_suppkey
         |    ORDER BY l_shipdate, l_orderkey, l_linenumber
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS DOUBLE) AS running_rev
         |FROM lineitem WHERE l_suppkey < 10""".stripMargin,

    "q_topk_per_group" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rk FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey) AS rk
        |  FROM orders) WHERE rk <= 3""".stripMargin,

    "q_sort_limit" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin,

    "q_set_ops" ->
      """SELECT 'union' AS op, k FROM (
        |  SELECT c_nationkey AS k FROM customer UNION SELECT s_nationkey FROM supplier)
        |UNION ALL
        |SELECT 'intersect' AS op, k FROM (
        |  SELECT c_nationkey AS k FROM customer INTERSECT SELECT s_nationkey FROM supplier)
        |UNION ALL
        |SELECT 'except' AS op, k FROM (
        |  SELECT c_nationkey AS k FROM customer EXCEPT SELECT s_nationkey FROM supplier)""".stripMargin,

    "q_distinct_agg" ->
      """SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS nd_part,
        |  COUNT(DISTINCT l_suppkey) AS nd_supp, COUNT(*) AS n
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,

    "q_array_funcs" ->
      """WITH g AS (SELECT o_orderpriority,
        |    list_sort(list(DISTINCT o_orderstatus)) AS statuses
        |  FROM orders GROUP BY o_orderpriority)
        |SELECT o_orderpriority,
        |  array_to_string(statuses, ',') AS statuses,
        |  CAST(len(statuses) AS BIGINT) AS n_statuses,
        |  list_contains(statuses, 'F') AS has_f,
        |  statuses[1] AS first_status
        |FROM g""".stripMargin,

    "q_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority,
        |  CAST(grouping(o_orderstatus) * 2 + grouping(o_orderpriority) AS BIGINT) AS gid,
        |  COUNT(*) AS n
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())""".stripMargin,

    "q_exists_subquery" ->
      """SELECT o_orderpriority, COUNT(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-07-01'
        |  AND o_orderdate < TIMESTAMP '1996-10-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey
        |                AND l_discount > 0.05)
        |GROUP BY o_orderpriority""".stripMargin,

    "q_scalar_subquery" ->
      s"""WITH a AS (SELECT l_partkey AS ak,
         |    CAST(ROUND(SUM(${sqlMoney("l_quantity")}), 4) AS DOUBLE) / COUNT(*) AS avg_qty
         |  FROM lineitem GROUP BY l_partkey)
         |SELECT COUNT(*) AS n_below,
         |  ${sqlSumMoney(sqlMoney("l_extendedprice"))} AS sum_price
         |FROM lineitem JOIN a ON l_partkey = ak
         |WHERE l_quantity < 0.5 * avg_qty""".stripMargin,

    "q_pivot" ->
      """SELECT o_orderpriority,
        |  CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
        |  CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
        |  CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_p
        |FROM orders GROUP BY o_orderpriority""".stripMargin,

    "q_bucketed_join" ->
      """SELECT c_nationkey, COUNT(*) AS n_orders,
        |  CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(14,6))), 4) AS DOUBLE) AS total
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_nationkey""".stripMargin,

    "q_cogroup" ->
      """SELECT c_custkey, c_nationkey,
        |  CAST(COUNT(o_custkey) AS BIGINT) AS n_orders,
        |  COALESCE(MAX(o_totalprice), 0.0) AS max_price
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey, c_nationkey""".stripMargin,

    "q_topk_agg" ->
      """SELECT o_custkey, CAST(rk AS BIGINT) AS rk, o_totalprice, o_orderkey
        |FROM (SELECT o_custkey, o_totalprice, o_orderkey,
        |        row_number() OVER (PARTITION BY o_custkey
        |          ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
        |      FROM orders)
        |WHERE rk <= 3""".stripMargin,

    "q_window_ntile" ->
      """SELECT o_orderkey, o_orderpriority, o_totalprice,
        |  CAST(ntile(8) OVER w AS BIGINT) AS octile,
        |  percent_rank() OVER w AS pct_rank,
        |  cume_dist() OVER w AS cume,
        |  nth_value(o_totalprice, 2) OVER (
        |    PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS second_low
        |FROM orders WHERE o_orderkey % 7 = 0
        |WINDOW w AS (PARTITION BY o_orderpriority
        |             ORDER BY o_totalprice, o_orderkey)""".stripMargin,

    "q_anomaly_bursts" ->
      """WITH daily AS (
        |  SELECT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d,
        |         COUNT(*) AS cnt
        |  FROM events GROUP BY 1, 2),
        |w AS (
        |  SELECT user_id, d, cnt,
        |    CAST(SUM(cnt) OVER (PARTITION BY user_id) AS BIGINT) AS total,
        |    COUNT(*) OVER (PARTITION BY user_id) AS n_days
        |  FROM daily)
        |SELECT user_id, d, cnt, total, n_days
        |FROM w WHERE cnt * n_days > 2 * total""".stripMargin,

    "q_window_range" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber,
        |  CAST(datediff('day', DATE '1992-01-01', CAST(l_shipdate AS DATE)) AS BIGINT) AS ship_day,
        |  CAST(COUNT(*) OVER w AS BIGINT) AS n_trailing_7d,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(14,6))) OVER w AS DOUBLE) AS qty_trailing_7d
        |FROM lineitem WHERE l_suppkey < 20
        |WINDOW w AS (PARTITION BY l_suppkey
        |  ORDER BY datediff('day', DATE '1992-01-01', CAST(l_shipdate AS DATE))
        |  RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)""".stripMargin,

    "q_join_right" ->
      """SELECT c_custkey, c_name, COUNT(o_orderkey) AS n_orders
        |FROM orders RIGHT JOIN (
        |  SELECT c_custkey, c_name FROM customer WHERE c_acctbal > 5000) c
        |ON c_custkey = o_custkey
        |GROUP BY c_custkey, c_name""".stripMargin,

    "q_set_ops_all" ->
      """WITH c AS (SELECT c_nationkey AS k FROM customer),
        |sup AS (SELECT s_nationkey AS k FROM supplier)
        |SELECT 'except_all' AS op, k, COUNT(*) AS n FROM (
        |  SELECT k FROM c EXCEPT ALL SELECT k FROM sup) GROUP BY k
        |UNION ALL
        |SELECT 'intersect_all', k, COUNT(*) FROM (
        |  SELECT k FROM c INTERSECT ALL SELECT k FROM sup) GROUP BY k""".stripMargin,

    "q_string_agg" ->
      """SELECT r_name,
        |  string_agg(n_name, ',' ORDER BY n_name) AS nations,
        |  COUNT(*) AS n_nations
        |FROM region JOIN nation ON r_regionkey = n_regionkey
        |GROUP BY r_name""".stripMargin,

    "q_lateral_topn" ->
      """SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
        |FROM customer c, LATERAL (
        |  SELECT o_orderkey, o_totalprice FROM orders o
        |  WHERE o.o_custkey = c.c_custkey
        |  ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 1) t""".stripMargin,

    "q_map_funcs" ->
      """SELECT o_orderstatus,
        |  CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT) AS n_priorities,
        |  CAST(NULLIF(COUNT(*) FILTER (WHERE o_orderpriority = '1-URGENT'), 0) AS BIGINT) AS n_urgent,
        |  COUNT(*) AS n_total
        |FROM orders GROUP BY o_orderstatus""".stripMargin,

    "q_sample_hash" ->
      """SELECT o_orderkey, o_custkey, o_orderpriority FROM orders
        |WHERE substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 4) < '4000'""".stripMargin,

    "q_sample_exact_n" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY CAST('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 12)
        |           AS BIGINT),
        |         o_orderkey
        |LIMIT 500""".stripMargin,

    "q_sample_stratified" ->
      """SELECT o_orderpriority, CAST(rk AS BIGINT) AS rk, o_orderkey,
        |  o_custkey, o_totalprice
        |FROM (
        |  SELECT o_orderpriority, o_orderkey, o_custkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_orderpriority
        |      ORDER BY CAST('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)),
        |                 1, 12) AS BIGINT),
        |        o_orderkey) AS rk
        |  FROM orders)
        |WHERE rk <= 100""".stripMargin,

    "q_unpivot" ->
      """WITH w AS (SELECT o_orderpriority,
        |    CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
        |    CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
        |    CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_p
        |  FROM orders GROUP BY o_orderpriority)
        |SELECT o_orderpriority, 'n_f' AS status_col, n_f AS n FROM w
        |UNION ALL SELECT o_orderpriority, 'n_o', n_o FROM w
        |UNION ALL SELECT o_orderpriority, 'n_p', n_p FROM w""".stripMargin,

    "q_histogram" ->
      """SELECT CAST(FLOOR(o_totalprice / 60000) AS BIGINT) AS bin,
        |  COUNT(*) AS n, MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi
        |FROM orders GROUP BY 1""".stripMargin,

    "q_percentile" ->
      """SELECT l_returnflag,
        |  percentile_cont(0.5) WITHIN GROUP (ORDER BY l_quantity) AS p50,
        |  percentile_cont(0.9) WITHIN GROUP (ORDER BY l_quantity) AS p90,
        |  MIN(l_quantity) AS qmin, MAX(l_quantity) AS qmax
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,

    "q_quantile_drift" ->
      """WITH e AS (SELECT event_type, event_id,
        |    CAST(FLOOR("value" * 1000) AS BIGINT) AS vq FROM events),
        |qa AS (SELECT event_type,
        |    quantile_cont(vq, [0.1, 0.25, 0.5, 0.75, 0.9]) AS ps
        |  FROM e WHERE event_id % 2 = 0 GROUP BY event_type),
        |qb AS (SELECT event_type,
        |    quantile_cont(vq, [0.1, 0.25, 0.5, 0.75, 0.9]) AS ps
        |  FROM e WHERE event_id % 2 = 1 GROUP BY event_type),
        |ua AS (SELECT event_type, qi, ps[qi] AS v_a FROM qa,
        |  UNNEST(range(1, 6)) AS t(qi)),
        |ub AS (SELECT event_type, qi, ps[qi] AS v_b FROM qb,
        |  UNNEST(range(1, 6)) AS t(qi))
        |SELECT ua.event_type,
        |  ([0.1, 0.25, 0.5, 0.75, 0.9])[ua.qi] AS quantile,
        |  v_a, v_b, ABS(v_a - v_b) AS v_diff
        |FROM ua FULL OUTER JOIN ub
        |  ON ua.event_type = ub.event_type AND ua.qi = ub.qi""".stripMargin,

    // property oracle: exact counts recomputed, sketch-accuracy boolean
    // expected TRUE (see the query comment)
    "q_approx_distinct" ->
      """SELECT l_returnflag,
        |  CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts,
        |  CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_supps,
        |  TRUE AS apx_ok
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,

    "q_approx_percentile" ->
      """SELECT l_returnflag,
        |  percentile_cont(0.5) WITHIN GROUP (ORDER BY l_quantity) AS p50,
        |  percentile_cont(0.9) WITHIN GROUP (ORDER BY l_quantity) AS p90,
        |  TRUE AS apx_ok
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,

    "q_hll_rollup" ->
      """SELECT CAST(date_trunc('week', CAST(ts AS TIMESTAMP)) AS DATE) AS grain,
        |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_exact,
        |  CAST(COUNT(DISTINCT CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS BIGINT)
        |    AS n_buckets,
        |  TRUE AS est_ok
        |FROM events GROUP BY 1""".stripMargin,

    "q_salted_join" ->
      """SELECT p_brand, COUNT(*) AS n_items,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(14,6))) AS DOUBLE) AS sum_qty
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand""".stripMargin,
    "q_rollup_agg" ->
      s"""SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
         |  ${sqlSumMoney(sqlMoney("l_quantity"))} AS sum_qty
         |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""".stripMargin,

    "q_cube_agg" ->
      s"""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
         |  ${sqlSumMoney(sqlMoney("o_totalprice"))} AS total
         |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)""".stripMargin,

    "q_scalar_funcs" ->
      """SELECT l_orderkey, l_linenumber,
        |  upper(l_returnflag) AS flag_u,
        |  concat(l_returnflag, '-', l_linestatus) AS tag,
        |  substring(l_linestatus, 1, 1) AS status1,
        |  CAST(length(l_returnflag) AS BIGINT) AS flag_len,
        |  abs(l_extendedprice - l_quantity * 100.0) AS price_dev,
        |  CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
        |  CAST(ceil(l_discount * 100.0) AS BIGINT) AS disc_pct_ceil,
        |  CASE WHEN l_quantity > 25 THEN 'big' ELSE 'small' END AS qty_class,
        |  coalesce(nullif(l_returnflag, 'N'), 'none') AS flag_or_none
        |FROM lineitem WHERE l_orderkey < 500""".stripMargin,

    "q_datetime_agg" ->
      s"""SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
         |  CAST(month(o_orderdate) AS BIGINT) AS mo,
         |  COUNT(*) AS n_orders,
         |  ${sqlSumMoney(sqlMoney("o_totalprice"))} AS total
         |FROM orders GROUP BY 1, 2""".stripMargin,

    "q_json_events" ->
      """SELECT event_type,
        |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |  COUNT(*) AS n
        |FROM events GROUP BY event_type""".stripMargin,

    "q_scd2_join" ->
      """WITH f AS (SELECT l_suppkey AS k,
        |    CAST(datediff('day', DATE '1992-01-01', CAST(l_shipdate AS DATE))
        |      AS BIGINT) AS t,
        |    l_returnflag, l_quantity FROM lineitem),
        |v AS (SELECT f.*, LEAST(t // 800, 2) AS ver FROM f),
        |j AS (SELECT v.l_returnflag, CAST(v.ver AS BIGINT) AS ver,
        |    v.l_quantity,
        |    CAST(FLOOR(s.s_acctbal) AS BIGINT) + v.ver AS bal_v
        |  FROM v JOIN supplier s ON s.s_suppkey = v.k)
        |SELECT l_returnflag, ver, COUNT(*) AS n,
        |  CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(14,6))), 4) AS DOUBLE)
        |    AS sum_qty,
        |  CAST(SUM(bal_v) AS BIGINT) AS sum_bal
        |FROM j GROUP BY 1, 2""".stripMargin,

    "q_try_funcs" ->
      """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS ln,
        |  CASE WHEN l_linenumber = 1 THEN NULL
        |       ELSE CAST(FLOOR(l_quantity * 100) AS DOUBLE)
        |            / CAST(l_linenumber - 1 AS DOUBLE) END AS qpd,
        |  CASE WHEN l_linenumber % 2 = 0 THEN CAST(l_linenumber AS BIGINT)
        |       ELSE TRY_CAST(l_returnflag AS BIGINT) END AS maybe_int,
        |  CAST(NULL AS VARCHAR) AS oob
        |FROM lineitem WHERE l_orderkey % 97 = 0""".stripMargin,

    "q_sql_udf" ->
      """SELECT l_returnflag, COUNT(*) AS n,
        |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(14,6))
        |    * CAST(1.0 - l_discount AS DECIMAL(8,6))), 4) AS DOUBLE) AS sum_charge
        |FROM lineitem
        |WHERE l_returnflag IN ('A', 'R')
        |GROUP BY l_returnflag""".stripMargin,

    "q_approx_topk" ->
      """SELECT l_returnflag, COUNT(*) AS cnt
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,

    "q_nullsafe_join" ->
      """WITH a AS (SELECT nullif(l_linestatus, 'O') AS k, l_quantity
        |  FROM lineitem),
        |b AS (SELECT DISTINCT k AS bk FROM a)
        |SELECT bk, COUNT(*) AS n,
        |  CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(14,6))), 4) AS DOUBLE)
        |    AS sum_qty
        |FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.bk
        |GROUP BY bk""".stripMargin,

    "q_group_sample" ->
      """SELECT o_orderpriority, o_orderstatus, o_orderkey,
        |  CAST(rk AS BIGINT) AS rk
        |FROM (SELECT o_orderpriority, o_orderstatus, o_orderkey,
        |        row_number() OVER (
        |          PARTITION BY o_orderpriority, o_orderstatus
        |          ORDER BY md5(CAST(o_orderkey AS VARCHAR)), o_orderkey) AS rk
        |      FROM orders)
        |WHERE rk <= 2""".stripMargin,

    "q_winsorize" ->
      """WITH b AS (SELECT l_returnflag,
        |    percentile_cont(0.05) WITHIN GROUP (ORDER BY l_extendedprice) AS lo,
        |    percentile_cont(0.95) WITHIN GROUP (ORDER BY l_extendedprice) AS hi
        |  FROM lineitem GROUP BY 1),
        |c AS (SELECT l.l_returnflag, l_extendedprice AS v,
        |    LEAST(GREATEST(l_extendedprice, lo), hi) AS vw
        |  FROM lineitem l JOIN b ON l.l_returnflag = b.l_returnflag)
        |SELECT l_returnflag, COUNT(*) AS n,
        |  CAST(ROUND(SUM(CAST(vw AS DECIMAL(14,6))), 4) AS DOUBLE) AS sum_w,
        |  CAST(SUM(CASE WHEN v < vw THEN 1 ELSE 0 END) AS BIGINT) AS n_lo,
        |  CAST(SUM(CASE WHEN v > vw THEN 1 ELSE 0 END) AS BIGINT) AS n_hi
        |FROM c GROUP BY 1""".stripMargin,

    "q_interval_overlap" ->
      """WITH iv AS (SELECT CAST(o_orderkey AS BIGINT) AS id,
        |    CAST(datediff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE))
        |      AS BIGINT) AS s
        |  FROM orders WHERE o_orderkey % 50 = 0),
        |iv2 AS (SELECT id, s, s + id % 30 AS e FROM iv)
        |SELECT a.id AS id_a, b.id AS id_b,
        |  CAST(LEAST(a.e, b.e) - GREATEST(a.s, b.s) + 1 AS BIGINT) AS overlap
        |FROM iv2 a JOIN iv2 b
        |  ON a.id < b.id AND a.s <= b.e AND b.s <= a.e""".stripMargin,

    "q_event_transitions" ->
      """WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id,
        |    event_type FROM events),
        |p AS (SELECT event_type,
        |    lead(event_type, 1) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS next_type
        |  FROM e)
        |SELECT event_type, next_type, COUNT(*) AS n
        |FROM p WHERE next_type IS NOT NULL
        |GROUP BY 1, 2""".stripMargin,

    "q_split_assign" ->
      """SELECT event_type,
        |  CASE WHEN substring(md5(CAST(event_id AS VARCHAR)), 1, 4) < 'cccd'
        |       THEN 'train'
        |       WHEN substring(md5(CAST(event_id AS VARCHAR)), 1, 4) < 'e666'
        |       THEN 'val' ELSE 'test' END AS split,
        |  COUNT(*) AS n
        |FROM events GROUP BY 1, 2""".stripMargin,

    "q_variant_events" ->
      """SELECT event_type,
        |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |  CAST(COUNT(json_extract_string(props, '$.missing')) AS BIGINT) AS n_missing_hits,
        |  COUNT(*) AS n
        |FROM events GROUP BY event_type""".stripMargin,

    "q_xml_roundtrip" ->
      """SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey, o_orderpriority,
        |  o_totalprice
        |FROM orders WHERE o_orderkey % 13 = 0""".stripMargin,

    "q_range_join_bands" ->
      s"""SELECT band_id, COUNT(*) AS n_parts,
         |  ${sqlSumMoney(sqlMoney("p_retailprice"))} AS sum_price
         |FROM part JOIN (VALUES (0, 900.0, 925.0), (1, 925.0, 950.0),
         |  (2, 950.0, 975.0), (3, 975.0, 1000.0)) AS b(band_id, lo, hi)
         |  ON p_retailprice >= lo AND p_retailprice < hi
         |GROUP BY band_id""".stripMargin,

    "q_asof_join" ->
      """WITH p AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id
        |           FROM events WHERE event_type = 'purchase'),
        |     g AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id
        |           FROM events WHERE event_type = 'signup')
        |SELECT p.event_id AS purchase_id, p.user_id AS user_id,
        |       g.event_id AS signup_id
        |FROM p ASOF LEFT JOIN g ON p.user_id = g.user_id AND p.ts >= g.ts""".stripMargin,

    "q_asof_forward" ->
      """WITH p AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id
        |           FROM events WHERE event_type = 'purchase'),
        |     g AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id
        |           FROM events WHERE event_type = 'signup')
        |SELECT g.event_id AS signup_id, g.user_id AS user_id,
        |       p.event_id AS purchase_id
        |FROM g ASOF LEFT JOIN p ON g.user_id = p.user_id AND g.ts <= p.ts""".stripMargin,

    "q_weighted_sample" ->
      """SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars
        |FROM documents
        |WHERE lpad(substring(md5(CAST(doc_id AS VARCHAR)), 1, 4), 5, '0')
        |    < lpad(printf('%x', (length(text) % 128) * 512), 5, '0')""".stripMargin,

    "q_asof_native" ->
      """WITH p AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id
        |           FROM events WHERE event_type = 'purchase'),
        |     g AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id
        |           FROM events WHERE event_type = 'signup')
        |SELECT p.event_id AS purchase_id, p.user_id AS user_id,
        |       g.event_id AS signup_id
        |FROM p ASOF LEFT JOIN g ON p.user_id = g.user_id AND p.ts >= g.ts""".stripMargin,

    "q_sessionize" ->
      """WITH e AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
        |     l AS (SELECT user_id, ts,
        |             lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        |           FROM e)
        |SELECT user_id,
        |  CAST(SUM(CASE WHEN prev_ts IS NULL
        |    OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000 THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions,
        |  COUNT(*) AS n_events
        |FROM l GROUP BY user_id""".stripMargin,

    "q_merge_upsert" ->
      """WITH latest AS (
        |  SELECT user_id + 1400 AS c_custkey, "value" AS new_bal
        |  FROM (SELECT user_id, "value", event_id,
        |          row_number() OVER (PARTITION BY user_id
        |            ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC) AS rn
        |        FROM events)
        |  WHERE rn = 1)
        |SELECT COALESCE(c.c_custkey, l.c_custkey) AS c_custkey,
        |  c.c_name, c.c_nationkey,
        |  COALESCE(l.new_bal, c.c_acctbal) AS c_acctbal,
        |  c.c_mktsegment
        |FROM customer c FULL OUTER JOIN latest l ON c.c_custkey = l.c_custkey""".stripMargin,

    "q_gap_fill" ->
      """WITH e AS (SELECT event_type,
        |    date_trunc('hour', CAST(ts AS TIMESTAMP)) AS h FROM events),
        |hours AS (SELECT unnest(generate_series(min(h), max(h),
        |    INTERVAL '1 hour')) AS h FROM e),
        |types AS (SELECT DISTINCT event_type FROM e),
        |counts AS (SELECT event_type, h, COUNT(*) AS n FROM e GROUP BY 1, 2)
        |SELECT t.event_type, hr.h AS h, CAST(COALESCE(c.n, 0) AS BIGINT) AS n_events
        |FROM types t CROSS JOIN hours hr
        |LEFT JOIN counts c ON c.event_type = t.event_type AND c.h = hr.h""".stripMargin,

    "q_ffill" ->
      """WITH e AS (SELECT user_id,
        |    CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d, "value" FROM events),
        |daily AS (SELECT user_id, d, MAX("value") AS obs FROM e GROUP BY 1, 2),
        |days AS (SELECT CAST(unnest(generate_series(CAST(min(d) AS TIMESTAMP),
        |    CAST(max(d) AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS d FROM e),
        |users AS (SELECT DISTINCT user_id FROM e),
        |grid AS (SELECT u.user_id, dy.d, da.obs
        |  FROM users u CROSS JOIN days dy
        |  LEFT JOIN daily da ON da.user_id = u.user_id AND da.d = dy.d)
        |SELECT user_id, d, obs,
        |  last_value(obs IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY d
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled
        |FROM grid""".stripMargin,

    "q_bloom_join" ->
      s"""SELECT l_returnflag, COUNT(*) AS n,
         |  ${sqlSumMoney(sqlMoney("l_quantity"))} AS sum_qty
         |FROM lineitem
         |WHERE l_suppkey IN (SELECT s_suppkey FROM supplier WHERE s_suppkey % 7 = 0)
         |GROUP BY l_returnflag""".stripMargin,

    "q_funnel" ->
      """WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_type
        |  FROM events),
        |s1 AS (SELECT user_id, MIN(ts) AS t_signup FROM e
        |       WHERE event_type = 'signup' GROUP BY 1),
        |s2 AS (SELECT e.user_id, MIN(e.ts) AS t_click
        |       FROM e JOIN s1 ON e.user_id = s1.user_id
        |       WHERE e.event_type = 'click' AND e.ts > s1.t_signup GROUP BY 1),
        |s3 AS (SELECT e.user_id, MIN(e.ts) AS t_purchase
        |       FROM e JOIN s2 ON e.user_id = s2.user_id
        |       WHERE e.event_type = 'purchase' AND e.ts > s2.t_click GROUP BY 1)
        |SELECT s1.user_id, s1.t_signup, s2.t_click, s3.t_purchase,
        |  CAST(1 + CASE WHEN s2.t_click IS NOT NULL THEN 1 ELSE 0 END
        |         + CASE WHEN s3.t_purchase IS NOT NULL THEN 1 ELSE 0 END
        |    AS BIGINT) AS stage
        |FROM s1 LEFT JOIN s2 ON s1.user_id = s2.user_id
        |        LEFT JOIN s3 ON s1.user_id = s3.user_id""".stripMargin,

    "q_cohort" ->
      """WITH e AS (SELECT user_id,
        |    CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d FROM events),
        |c AS (SELECT user_id, MIN(d) AS cohort_day FROM e GROUP BY 1)
        |SELECT c.cohort_day,
        |  CAST(e.d - c.cohort_day AS BIGINT) AS day_offset,
        |  CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_users
        |FROM e JOIN c ON e.user_id = c.user_id
        |GROUP BY 1, 2""".stripMargin,

    "q_corr" ->
      """WITH v AS (SELECT l_returnflag,
        |    CAST(FLOOR(l_quantity * 100) AS BIGINT) AS x,
        |    CAST(FLOOR(l_extendedprice) AS BIGINT) AS y
        |  FROM lineitem),
        |g AS (SELECT l_returnflag, COUNT(*) AS n,
        |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
        |    CAST(SUM(x * x) AS BIGINT) AS sxx, CAST(SUM(y * y) AS BIGINT) AS syy,
        |    CAST(SUM(x * y) AS BIGINT) AS sxy
        |  FROM v GROUP BY 1)
        |SELECT l_returnflag, n,
        |  (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
        |    (SQRT(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
        |     SQRT(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
        |    AS corr_q,
        |  (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
        |    (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) AS covar_q
        |FROM g""".stripMargin,

    "q_redact" ->
      """SELECT event_id,
        |  regexp_replace(props, '[0-9]', '#', 'g') AS props_masked,
        |  CAST(length(props) -
        |    length(regexp_replace(props, '[0-9]', '', 'g')) AS BIGINT) AS n_redacted
        |FROM events""".stripMargin,

    "q_profile" ->
      """WITH one AS (SELECT COUNT(*) AS n_rows,
        |  CAST(SUM(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS q_nulls,
        |  CAST(COUNT(DISTINCT l_quantity) AS BIGINT) AS q_ndv,
        |  MIN(l_quantity) AS q_min, MAX(l_quantity) AS q_max,
        |  CAST(SUM(CASE WHEN l_extendedprice IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS p_nulls,
        |  CAST(COUNT(DISTINCT l_extendedprice) AS BIGINT) AS p_ndv,
        |  MIN(l_extendedprice) AS p_min, MAX(l_extendedprice) AS p_max,
        |  CAST(SUM(CASE WHEN l_discount IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS d_nulls,
        |  CAST(COUNT(DISTINCT l_discount) AS BIGINT) AS d_ndv,
        |  MIN(l_discount) AS d_min, MAX(l_discount) AS d_max
        |FROM lineitem)
        |SELECT 'l_quantity' AS col_name, n_rows, q_nulls AS n_null,
        |  q_ndv AS n_distinct, q_min AS min_v, q_max AS max_v FROM one
        |UNION ALL
        |SELECT 'l_extendedprice', n_rows, p_nulls, p_ndv, p_min, p_max FROM one
        |UNION ALL
        |SELECT 'l_discount', n_rows, d_nulls, d_ndv, d_min, d_max FROM one""".stripMargin)
}
