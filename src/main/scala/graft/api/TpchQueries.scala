package graft.api
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ingest.Melt


/**
 * General analytics over the TPC-H-ish star schema: demonstrates the
 * engine's join/aggregate/window surface beyond the reference's own
 * operator set (the reference has NO joins or analytic windows at all,
 * SURVEY §2.4/§2.5).
 *
 * Scale notes baked into the plans:
 *  - q3 joins fact lineitem to orders on the join key and BROADCASTs
 *    the filtered customer dimension — the big side never shuffles for
 *    the dimension join;
 *  - q1/q6 are pure scan+aggregate: predicate pushdown to parquet and
 *    map-side partial aggregation leave one tiny shuffle;
 *  - sessionization is one window + one aggregate, partitioned by
 *    user_id (no skew: synthetic users are uniform).
 */
object TpchQueries {
  type Q = (SparkSession, String) => DataFrame

  private def r6(c: Column): Column = round(c, 6)
  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    graft.util.SchemaMemo.read(s, s"$dir/$name.parquet")

  private val ShipCutoffUs = 915148800000000L // 1999-01-01T00:00:00Z
  private val SessionGapUs = 1800000000L // 30 min

  val queries: Map[String, Q] = Map(
    "q1_agg" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      // filter on the NATIVE timestamp column (pushed to the parquet
      // scan); a predicate on the derived epoch cast would not push
      li.where(col("l_shipdate") <= lit(java.time.LocalDateTime.parse("1999-01-01T00:00:00")))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          r6(sum(col("l_quantity"))).as("sum_qty"),
          r6(sum(col("l_extendedprice"))).as("sum_base_price"),
          r6(sum(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("sum_disc_price"),
          r6(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))
            * (lit(1) + col("l_tax")))).as("sum_charge"),
          r6(avg(col("l_quantity"))).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    "q3_join" -> ((s, dir) => {
      val cutUs = ShipCutoffUs
      val cust = t(s, dir, "customer").where(col("c_mktsegment") === "BUILDING")
      val ord = t(s, dir, "orders")
      val cutLdt = lit(java.time.LocalDateTime.parse("1999-01-01T00:00:00"))
      val ordUs = ord.where(col("o_orderdate") < cutLdt)
        .withColumn("order_us", Melt.tsUs(ord, "o_orderdate"))
      val li = t(s, dir, "lineitem")
      val liUs = li.where(col("l_shipdate") > cutLdt)
        .withColumn("ship_us", Melt.tsUs(li, "l_shipdate"))
      liUs
        .join(ordUs, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .groupBy(col("o_orderkey"), col("order_us"), col("o_orderpriority"))
        .agg(r6(sum(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("revenue"))
        .orderBy("o_orderkey")
    }),

    // q5-style regional revenue: the 6-table join exercise. Plan shape:
    // the region→nation→(customer, supplier) dimension chain is tiny
    // and BROADCASTS — the only fact-fact shuffle is
    // lineitem ⨝ orders on orderkey; the c_nationkey = s_nationkey
    // local-supplier condition rides the joined row as a filter, never
    // a join explosion. At 100 TB both fact sides are bucketed on
    // orderkey (see Joins in SCALE.md); dims broadcast at any scale.
    "q5_join" -> ((s, dir) => {
      val lo = lit(java.time.LocalDateTime.parse("1997-01-01T00:00:00"))
      val hi = lit(java.time.LocalDateTime.parse("1999-01-01T00:00:00"))
      val nat = t(s, dir, "nation")
        .join(t(s, dir, "region").where(col("r_name") === "ASIA"),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"), col("n_name"))
      val cust = t(s, dir, "customer")
        .join(nat, col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("c_nationkey"), col("n_name"))
      val supp = t(s, dir, "supplier")
        .select(col("s_suppkey"), col("s_nationkey"))
      val ord = t(s, dir, "orders")
        .where(col("o_orderdate") >= lo && col("o_orderdate") < hi)
        .select(col("o_orderkey"), col("o_custkey"))
      t(s, dir, "lineitem")
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
        .where(col("c_nationkey") === col("s_nationkey"))
        .groupBy(col("n_name"))
        .agg(r6(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))))
          .as("revenue"),
          count(lit(1)).as("n_rows"))
        .orderBy(col("revenue").desc, col("n_name"))
    }),

    // interval counting: how many orders are OPEN (placed, not yet
    // fully shipped) on each day — the classic event-interval stabbing
    // query, computed as +1/−1 deltas at order/last-ship days and one
    // running sum over the DAY grain (calendar-bounded, so the global
    // cumulative window is a few-thousand-row reduce at any fact
    // size). Orders that never ship stay in the backlog forever.
    "orders_backlog_daily" -> ((s, dir) => {
      val ord = t(s, dir, "orders")
      val opens = ord
        .select(Melt.tsUs(ord, "o_orderdate").as("us"))
        .select(expr("us div 86400000000").as("day"), lit(1L).as("delta"))
      val li = t(s, dir, "lineitem")
      val closes = li
        .groupBy("l_orderkey")
        .agg(max(Melt.tsUs(li, "l_shipdate")).as("ship_us"))
        .select(expr("ship_us div 86400000000").as("day"),
          lit(-1L).as("delta"))
      val w = Window.orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
      opens.unionByName(closes)
        .groupBy("day").agg(sum(col("delta")).as("d"))
        .withColumn("n_open", sum(col("d")).over(w))
        .select(col("day"), col("n_open"))
        .orderBy("day")
    }),

    // q18-style large-volume customers: orders whose total lineitem
    // quantity tops 300, joined back to order and customer detail.
    // Scale shape: the HAVING aggregate is ONE shuffle of lineitem on
    // its join key with map-side partials; the survivor set is tiny at
    // any sf (heavy-order tail), so it BROADCASTS into orders and the
    // joined pair broadcasts again into customer — the two big tables
    // never shuffle for the joins. The global top-100 sort runs on the
    // survivor rows only.
    "q18_topk" -> ((s, dir) => {
      val big = t(s, dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(r6(sum(col("l_quantity"))).as("sum_qty"))
        .where(col("sum_qty") > 300)
      val ord = t(s, dir, "orders")
      val ordUs = ord.withColumn("order_us", Melt.tsUs(ord, "o_orderdate"))
      val ordBig = ordUs.join(broadcast(big),
          col("o_orderkey") === col("l_orderkey"))
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
          col("order_us"), col("sum_qty"))
      t(s, dir, "customer")
        .join(broadcast(ordBig), col("c_custkey") === col("o_custkey"))
        .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
          col("order_us"), col("o_totalprice"), col("sum_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100)
    }),

    // k-anonymity audit: group sizes over the quasi-identifier tuple
    // (nation, market segment, account-balance band) with an at-risk
    // flag where fewer than k=5 customers share the tuple — the
    // re-identification exposure report a privacy review runs before
    // releasing joined data. ONE hash aggregate; output cardinality is
    // the QI cell space (bounded by the attribute domains), never the
    // row count — scale-indifferent.
    "k_anonymity" -> ((s, dir) =>
      t(s, dir, "customer")
        .groupBy(
          col("c_nationkey").as("nation"),
          col("c_mktsegment").as("segment"),
          floor(col("c_acctbal") / 1000).cast("long").as("bal_bin"))
        .agg(count(lit(1)).as("n"))
        .withColumn("at_risk", col("n") < 5)
        .orderBy("nation", "segment", "bal_bin")),

    // q10-style returned-item customer ranking: revenue lost to
    // returns in one quarter, per customer, top 20. Scale shape: the
    // only fact-fact shuffle is lineitem('R') ⨝ date-filtered orders on
    // orderkey; the per-customer aggregate is tiny (one quarter's
    // returners) and BROADCASTS into the customer dimension, which
    // never shuffles; nation broadcasts into customer. Top-20 rides
    // TakeOrderedAndProject.
    "q10_returns" -> ((s, dir) => {
      val lo = lit(java.time.LocalDateTime.parse("1997-01-01T00:00:00"))
      val hi = lit(java.time.LocalDateTime.parse("1997-04-01T00:00:00"))
      val ord = t(s, dir, "orders")
        .where(col("o_orderdate") >= lo && col("o_orderdate") < hi)
        .select(col("o_orderkey"), col("o_custkey"))
      val rev = t(s, dir, "lineitem")
        .where(col("l_returnflag") === "R")
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_custkey")
        .agg(r6(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))))
          .as("revenue"))
      val nat = t(s, dir, "nation").select(col("n_nationkey"), col("n_name"))
      t(s, dir, "customer")
        .join(broadcast(rev), col("c_custkey") === col("o_custkey"))
        .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("c_name"), col("revenue"),
          col("c_acctbal"), col("n_name"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    }),

    // blocked edit-distance similarity join (record linkage): pairs of
    // DISTINCT part names within Levenshtein 2, candidates generated by
    // blocking on the head noun (the last token) and verified exactly
    // inside each block. Scale shape: the name CATALOG (not the part
    // rows) self-joins, and blocking bounds candidates to Σ|block|²
    // instead of N² — at web scale the blocking key swaps for sorted-
    // neighborhood or MinHash candidates (dedup_sorted_nbr /
    // dedup_minhash) while this exact verify stage stays identical.
    "fuzzy_name_match" -> ((s, dir) => {
      val names = t(s, dir, "part")
        .groupBy(col("p_name").as("name"))
        .agg(count(lit(1)).as("n_parts"))
        .withColumn("noun", element_at(split(col("name"), " "), -1))
      names.as("a").join(names.as("b"),
          col("a.noun") === col("b.noun") && col("a.name") < col("b.name"))
        .withColumn("dist", levenshtein(col("a.name"), col("b.name")))
        .where(col("dist") <= 2)
        .select(
          col("a.name").as("name_a"), col("b.name").as("name_b"),
          col("dist").cast("long").as("dist"),
          col("a.n_parts").as("n_a"), col("b.n_parts").as("n_b"))
        .orderBy("name_a", "name_b")
    }),

    // concentration (Pareto) curve: rank suppliers by account balance
    // and report the cumulative balance share at each rank decile —
    // the 80/20 view. The global rank runs over a DIMENSION table
    // (catalog-bounded); shares are exact integer ppm of cent-exact
    // sums, so the curve hash-matches across engines.
    "supplier_pareto" -> ((s, dir) => {
      val sup = t(s, dir, "supplier")
        .select(col("s_suppkey"),
          round(col("s_acctbal") * lit(100)).cast("long").as("cents"))
      val n = broadcast(sup.agg(count(lit(1)).as("nn"),
        sum(col("cents")).as("tot")))
      val w = Window.orderBy(col("cents").desc, col("s_suppkey"))
      val cw = Window.orderBy("decile")
        .rowsBetween(Window.unboundedPreceding, 0)
      sup.crossJoin(n)
        .withColumn("rk", row_number().over(w).cast("long"))
        .select(expr("((rk - 1) * 10) div nn").as("decile"),
          col("cents"), col("tot"))
        .groupBy("decile")
        .agg(sum(col("cents")).as("dc"), max(col("tot")).as("tot"),
          count(lit(1)).as("n_suppliers"))
        .withColumn("cum_share_ppm",
          expr("(1000000 * sum(dc) OVER (ORDER BY decile " +
            "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) div tot"))
        .select(col("decile"), col("n_suppliers"), col("dc").as("cents"),
          col("cum_share_ppm"))
        .orderBy("decile")
    }),

    // Bloom semi-join pushdown: the 1-URGENT orders' keys fold into a
    // fixed-KB Bloom that prunes lineitem BEFORE the join shuffle —
    // ~80% of fact rows never enter the exchange, at any fact size
    // (the explicit, deterministic form of Spark's runtime-filter
    // injection). False positives are removed by the exact join that
    // follows, so the result is Bloom-independent — the oracle is the
    // plain join, proving the pushdown is semantics-free.
    "bloom_semi_join" -> ((s, dir) => {
      val urgent = t(s, dir, "orders")
        .where(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"))
      val pruned = graft.sketch.Sketches.bloomMember(
        urgent, "o_orderkey",
        t(s, dir, "lineitem").select(
          col("l_orderkey"), col("l_extendedprice"), col("l_discount")),
        "l_orderkey")
      pruned
        .join(urgent, col("l_orderkey") === col("o_orderkey"))
        .agg(
          r6(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))))
            .as("revenue"),
          count(lit(1)).as("n_rows"))
    }),

    // CUBE subtotals: revenue at every (returnflag × linestatus)
    // grouping-set combination including grand total — the reporting
    // rollup the reference's flat aggregations can't express. Spark
    // plans CUBE as one Expand + hash agg: the 4× row expansion is
    // absorbed by map-side partial aggregation, so the shuffle carries
    // (grouping-set × group) partials, never expanded input rows.
    "cube_revenue" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(r6(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))))
          .as("revenue"),
          count(lit(1)).as("n_rows"))
        .orderBy("l_returnflag", "l_linestatus")),

    // TPC-H Q4 shape on the slim schema (no l_commitdate → "shipped
    // after order date" is the late-lineitem predicate): an EXISTS
    // SEMI-join — the orders side never duplicates however many
    // lineitems match, and Catalyst plans LeftSemi with the date
    // filters pushed to both scans
    "q4_priority" -> ((s, dir) => {
      val ord = t(s, dir, "orders")
        .where(col("o_orderdate") >= lit(java.time.LocalDateTime.parse("1996-01-01T00:00:00")) &&
          col("o_orderdate") < lit(java.time.LocalDateTime.parse("1996-04-01T00:00:00")))
      val li = t(s, dir, "lineitem")
      ord.join(li,
          ord("o_orderkey") === li("l_orderkey") &&
            li("l_shipdate") > ord("o_orderdate"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("order_count"))
        .orderBy("o_orderpriority")
    }),
    // TPC-H Q12 shape (l_returnflag stands in for the missing
    // l_shipmode): one orders⋈lineitem join, CASE-split counts by
    // priority class per mode — map-side partials carry the two
    // counters, the join shuffles on the order key only
    "q12_modes" -> ((s, dir) => {
      val hi = Seq("1-URGENT", "2-HIGH")
      val li = t(s, dir, "lineitem")
        .where(col("l_shipdate") >= lit(java.time.LocalDateTime.parse("1996-01-01T00:00:00")) &&
          col("l_shipdate") < lit(java.time.LocalDateTime.parse("1997-01-01T00:00:00")))
      t(s, dir, "orders").join(li, col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("l_returnflag").as("mode"))
        .agg(
          sum(when(col("o_orderpriority").isin(hi: _*), 1L).otherwise(0L))
            .as("high_line_count"),
          sum(when(!col("o_orderpriority").isin(hi: _*), 1L).otherwise(0L))
            .as("low_line_count"))
        .orderBy("mode")
    }),
    // TPC-H Q14: promo revenue share for one month — the part dim
    // BROADCASTS (explicitly: it is dimension-small at every SF), the
    // month filter pushes to the lineitem scan, one agg row out
    "q14_promo" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
        .where(col("l_shipdate") >= lit(java.time.LocalDateTime.parse("1996-09-01T00:00:00")) &&
          col("l_shipdate") < lit(java.time.LocalDateTime.parse("1996-10-01T00:00:00")))
      val rev = col("l_extendedprice") * (lit(1) - col("l_discount"))
      li.join(broadcast(t(s, dir, "part")),
          col("l_partkey") === col("p_partkey"))
        .agg(r6(lit(100.0) *
          sum(when(col("p_type") === "PROMO", rev).otherwise(lit(0.0))) /
          sum(rev)).as("promo_revenue"))
    }),
    "q6_filter" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      li.where(
          col("l_shipdate") >= lit(java.time.LocalDateTime.parse("1996-01-01T00:00:00")) &&
            col("l_shipdate") < lit(java.time.LocalDateTime.parse("1997-01-01T00:00:00")) &&
            col("l_discount").between(0.05, 0.07) &&
            col("l_quantity") < 24)
        .agg(
          r6(sum(col("l_extendedprice") * col("l_discount"))).as("revenue"),
          count(lit(1)).as("n_rows"))
    }),

    // TPC-H Q7: bilateral trade volume between two nations by ship
    // year. Plan shape: the ONLY fact-fact shuffle is
    // lineitem ⨝ orders on the order key; customer+nation and
    // supplier+nation are dimension chains that BROADCAST, and the
    // bilateral disjunction rides the joined row as a filter (never a
    // join condition that would block broadcast planning)
    "q7_volume" -> ((s, dir) => {
      val (na, nb) = ("NATION_1", "NATION_2")
      val natPair = t(s, dir, "nation")
        .where(col("n_name").isin(na, nb))
      val cust = t(s, dir, "customer")
        .join(natPair, col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("n_name").as("cust_nation"))
      val supp = t(s, dir, "supplier")
        .join(natPair, col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("supp_nation"))
      t(s, dir, "lineitem")
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
        .where((col("supp_nation") === na && col("cust_nation") === nb) ||
          (col("supp_nation") === nb && col("cust_nation") === na))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).cast("long").as("l_year"))
        .agg(r6(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))))
          .as("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    }),
    // TPC-H Q8: one nation's market share of a product type inside one
    // region's customer market, per order year. The numerator rides
    // the same aggregated rows as the denominator (a CASE inside the
    // sum — one pass, no second join); part/customer-region/supplier
    // dims all broadcast; the fact-fact join shuffles on orderkey only
    "q8_share" -> ((s, dir) => {
      val target = "NATION_3"
      val regionNat = t(s, dir, "nation")
        .join(t(s, dir, "region").where(col("r_name") === "AFRICA"),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"))
      val cust = t(s, dir, "customer")
        .join(regionNat, col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"))
      val supp = t(s, dir, "supplier")
        .join(t(s, dir, "nation"),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("supp_nation"))
      val rev = col("l_extendedprice") * (lit(1) - col("l_discount"))
      t(s, dir, "lineitem")
        .join(broadcast(t(s, dir, "part").where(col("p_type") === "PROMO")),
          col("l_partkey") === col("p_partkey"))
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
        .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
        .agg(r6(
          sum(when(col("supp_nation") === target, rev).otherwise(lit(0.0))) /
            sum(rev)).as("mkt_share"))
        .orderBy("o_year")
    }),
    // TPC-H Q13: customer distribution by order count — the classic
    // LEFT OUTER + two-level aggregate (customers with zero orders
    // count at c_count = 0). Orders pre-aggregate to customer grain
    // BEFORE the outer join, so the join is key-to-key (no row
    // explosion) and the second aggregate runs on 1 row per customer
    "q13_custdist" -> ((s, dir) => {
      val perCust = t(s, dir, "orders")
        .groupBy("o_custkey").agg(count(lit(1)).as("n"))
      t(s, dir, "customer")
        .join(perCust, col("c_custkey") === col("o_custkey"), "left_outer")
        .select(coalesce(col("n"), lit(0L)).as("c_count"))
        .groupBy("c_count").agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    }),
    // TPC-H Q15: top supplier(s) by revenue in one quarter. The max is
    // computed over ROUNDED per-supplier revenue (r6 on both engines)
    // so the equality join cannot flip on last-ulp float drift; the
    // revenue aggregate is one shuffle of the filtered fact at
    // supplier grain, and the 1-row max broadcasts back
    "q15_topsupp" -> ((s, dir) => {
      val rev = t(s, dir, "lineitem")
        .where(col("l_shipdate") >= lit(java.time.LocalDateTime.parse("1997-01-01T00:00:00")) &&
          col("l_shipdate") < lit(java.time.LocalDateTime.parse("1997-04-01T00:00:00")))
        .groupBy("l_suppkey")
        .agg(r6(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))))
          .as("total_revenue"))
      val top = rev.agg(max(col("total_revenue")).as("mx"))
      rev.join(broadcast(top), col("total_revenue") === col("mx"))
        .join(broadcast(t(s, dir, "supplier")),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
        .orderBy("s_suppkey")
    }),
    // TPC-H Q17: revenue loss if small-quantity orders (below 20% of
    // the part's average quantity) were dropped, for one brand. The
    // correlated per-part average becomes a part-grain aggregate
    // BROADCAST back onto the fact rows — the fact never shuffles for
    // the correlation, one scalar row out
    "q17_smallqty" -> ((s, dir) => {
      val brandParts = t(s, dir, "part")
        .where(col("p_brand") === "Brand#1").select("p_partkey")
      val li = t(s, dir, "lineitem")
        .join(broadcast(brandParts), col("l_partkey") === col("p_partkey"))
      val avgQty = li.groupBy("l_partkey")
        .agg((lit(0.2) * avg(col("l_quantity"))).as("qty_cut"))
      li.join(broadcast(avgQty), Seq("l_partkey"))
        .where(col("l_quantity") < col("qty_cut"))
        .agg(r6(sum(col("l_extendedprice")) / lit(7.0)).as("avg_yearly"),
          count(lit(1)).as("n_rows"))
    }),
    // TPC-H Q19: disjunctive brand/size/quantity predicate bands —
    // the classic OR-of-ANDs that must still broadcast the part dim
    // and evaluate as ONE joined-row filter (a naive per-band UNION
    // would scan the fact three times)
    "q19_disjunct" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      def band(brand: String, szLo: Int, szHi: Int, qLo: Int, qHi: Int) =
        col("p_brand") === brand &&
          col("p_size").between(szLo, szHi) &&
          col("l_quantity").between(qLo, qHi)
      li.join(broadcast(t(s, dir, "part")),
          col("l_partkey") === col("p_partkey"))
        .where(band("Brand#1", 1, 15, 1, 20) ||
          band("Brand#2", 10, 30, 10, 30) ||
          band("Brand#3", 20, 50, 20, 40))
        .agg(r6(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))))
          .as("revenue"),
          count(lit(1)).as("n_rows"))
    }),
    // TPC-H Q22: well-funded customers (balance above the positive-
    // balance average) who never ordered, grouped by nation. The
    // scalar average broadcasts as a 1-row cross join; the "never
    // ordered" test is a LEFT ANTI against orders pre-projected to its
    // key column (orders never duplicates, the anti side shuffles at
    // key grain)
    "q22_noorders" -> ((s, dir) => {
      val cust = t(s, dir, "customer")
      val cut = cust.where(col("c_acctbal") > 0.0)
        .agg(avg(col("c_acctbal")).as("cut"))
      cust
        .crossJoin(broadcast(cut)) // 1-row scalar fold
        .where(col("c_acctbal") > col("cut"))
        .join(t(s, dir, "orders").select("o_custkey"),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_nationkey").cast("long").as("nationkey"))
        .agg(count(lit(1)).as("numcust"),
          r6(sum(col("c_acctbal"))).as("totacctbal"))
        .orderBy("nationkey")
    }),

    // backward as-of join: each purchase attributed to the user's
    // latest prior view (union+running-window plan — one shuffle by
    // user_id, no range explosion; graft.ops.Temporal)
    // MULTI-touch attribution with time decay: every view in the
    // 3000 s window before a purchase earns integer-ppm credit that
    // halves-ish by age band (w = 1e6/(1+age/600)), normalized per
    // purchase — the linear/time-decay models marketing attribution
    // uses beyond asof_attribution's last-touch. Shape: one
    // user_id-keyed join with the window as a filter (the
    // stream_join_3000s batch twin), then a purchase-grain aggregate;
    // all positive-integer arithmetic, cross-engine exact
    "attribution_decay" -> ((s, dir) => {
      val e = CoreQueries.rawEvents(s, dir)
      val p = e.where(col("event_type") === "purchase")
        .select(col("event_id").as("p_id"), col("user_id"), col("ts_us").as("p_us"))
      val v = e.where(col("event_type") === "view")
        .select(col("user_id"), col("ts_us").as("v_us"))
      p.join(v, Seq("user_id"))
        .where(col("v_us") <= col("p_us") &&
          col("v_us") >= col("p_us") - lit(3000L * 1000000L))
        .withColumn("age_s", expr("(p_us - v_us) div 1000000"))
        .withColumn("w", expr("1000000 div (1 + age_s div 600)"))
        .groupBy("p_id")
        .agg(
          count(lit(1)).as("n_touches"),
          sum(col("w")).as("sum_w"),
          max(struct(col("v_us"), col("w"))).getField("w").as("last_w"),
          min(struct(col("v_us"), col("w"))).getField("w").as("first_w"))
        .select(
          col("p_id"), col("n_touches"),
          expr("1000000 * last_w div sum_w").as("last_share_ppm"),
          expr("1000000 * first_w div sum_w").as("first_share_ppm"))
        .orderBy("p_id")
    }),

    "asof_attribution" -> ((s, dir) => {
      val e = CoreQueries.rawEvents(s, dir)
      val p = e.where(col("event_type") === "purchase")
        .select(col("event_id").as("p_id"), col("user_id"), col("ts_us").as("p_us"))
      val v = e.where(col("event_type") === "view")
        .select(col("user_id"), col("ts_us"), col("event_id"))
      graft.ops.Temporal
        .asofBackward(p, v, Seq("user_id"), "p_us", "ts_us", Seq("event_id"))
        .select(
          col("p_id"), col("user_id"), col("p_us"),
          col("asof.event_id").as("v_id"), col("asof.ts_us").as("v_us"),
          (col("p_us") - col("asof.ts_us")).as("gap_us"))
        .orderBy("p_id")
    }),

    // forward as-of: first view ON OR AFTER each purchase by the same
    // user — time-to-next-action attribution, the mirror of
    // asof_attribution with the identical single-shuffle plan
    "asof_next" -> ((s, dir) => {
      val e = CoreQueries.rawEvents(s, dir)
      val p = e.where(col("event_type") === "purchase")
        .select(col("event_id").as("p_id"), col("user_id"), col("ts_us").as("p_us"))
      val v = e.where(col("event_type") === "view")
        .select(col("user_id"), col("ts_us"), col("event_id"))
      graft.ops.Temporal
        .asofForward(p, v, Seq("user_id"), "p_us", "ts_us", Seq("event_id"))
        .select(
          col("p_id"), col("user_id"), col("p_us"),
          col("asof.event_id").as("v_id"), col("asof.ts_us").as("v_us"),
          (col("asof.ts_us") - col("p_us")).as("gap_us"))
        .orderBy("p_id")
    }),

    // NEAREST-datapoint join: synthetic comments (every ~401st melted
    // row, md5-deterministic, pinned 0.3 s after their source point)
    // attach to the closest datapoint of their series in EITHER time
    // direction — the chart co-display join SURVEY §2.5 names as the
    // one reference-adjacent stretch (the reference renders comments
    // on the time axis without joining them to data, graph.js:198).
    // The tiny annotation side broadcasts over ONE scan of the data
    // side (lexicographic argmin struct fold with map-side combine —
    // no data-side shuffle); equidistant ties take the earlier point
    "comments_asof_nearest" -> ((s, dir) => {
      val long = CoreQueries.ev(s, dir)
      val h = pmod(
        conv(substring(
          md5(concat_ws("|", col("dataset_id"), col("ts_us"))), 1, 15), 16, 10)
          .cast("long"),
        lit(401L))
      val comments = long.where(h === 0)
        .select(col("dataset_id"), (col("ts_us") + 300000L).as("date_us"))
      graft.ops.Temporal
        .nearestJoin(comments, long, Seq("dataset_id"),
          "date_us", "ts_us", Seq("value"))
        .select(
          col("dataset_id"), col("date_us"),
          col("nearest.diff_us").as("diff_us"),
          col("nearest.ts_us").as("ts_us"),
          col("nearest.value").as("value"))
        .orderBy("dataset_id", "date_us")
    }),

    // sliding-window aggregate (60 s window, 15 s slide) — the
    // streaming-rate view the reference's tumbling-only pyramid lacks
    "sliding_60s_15s" -> ((s, dir) =>
      graft.ops.Temporal.slidingAgg(CoreQueries.ev(s, dir), 60, 15)
        .select(
          col("dataset_id"), col("win_s"),
          col("min_v"), col("max_v"), r6(col("sum_v")).as("sum_v"), col("cnt"))
        .orderBy("dataset_id", "win_s")),

    // top-3 events per user by value — rank window over a key whose
    // cardinality grows with the data (no 5-partition skew)
    "topk_per_user" -> ((s, dir) =>
      graft.ops.Temporal.topKPerKey(
        CoreQueries.rawEvents(s, dir)
          .where(col("value").isNotNull && !isnan(col("value")))
          .select(col("user_id"), col("event_id"), col("value")),
        Seq("user_id"), Seq(col("value").desc, col("event_id")), 3)
        .withColumn("rank", col("rank").cast("long"))
        .orderBy("user_id", "rank")),

    // skew-proof salted top-k: same semantics as topk_per_user but per
    // EVENT TYPE — a 5-value key over ~n rows, i.e. genuinely hot keys
    // that would funnel the whole table into 5 window tasks. The
    // two-stage salted form bounds every task at k·salts rows per key;
    // the oracle is the direct single-window formulation, proving the
    // salting is result-invariant (Temporal.saltedTopKPerKey).
    "salted_topk" -> ((s, dir) =>
      graft.ops.Temporal.saltedTopKPerKey(
        CoreQueries.rawEvents(s, dir)
          .where(col("value").isNotNull && !isnan(col("value")))
          .select(col("event_type"), col("event_id"), col("value")),
        Seq("event_type"), Seq(col("value").desc, col("event_id")), 5,
        saltOn = col("event_id"), salts = 16)
        .withColumn("rank", col("rank").cast("long"))
        .orderBy("event_type", "rank")),

    // bucketed tolerance (range) join: views within ±30 s of each
    // purchase across ALL users — no range cross join (Temporal
    // .toleranceJoin); zero-match purchases kept via a left join to
    // the aggregated pair counts
    "range_join_30s" -> ((s, dir) => {
      val e = CoreQueries.rawEvents(s, dir)
      val tol = 30000000L
      val p = e.where(col("event_type") === "purchase")
        .select(col("event_id").as("p_id"), col("ts_us").as("p_us"))
      val v = e.where(col("event_type") === "view")
        .select(col("ts_us").as("v_us"))
      val pairs = graft.ops.Temporal.toleranceJoin(p, v, "p_us", "v_us", tol)
      val counts = pairs.groupBy("p_id")
        .agg(
          count(lit(1)).as("n_views_30s"),
          min(abs(col("p_us") - col("v_us"))).as("min_gap_us"))
      p.join(counts, Seq("p_id"), "left_outer")
        .select(
          col("p_id"), col("p_us"),
          coalesce(col("n_views_30s"), lit(0L)).as("n_views_30s"),
          col("min_gap_us"))
        .orderBy("p_id")
    }),

    // ordered event funnel: view → click-after-view → purchase-after-
    // click, each stage a per-user min over the events AFTER the prior
    // stage's timestamp. Three aggregations + two joins, ALL keyed on
    // user_id — after the first shuffle every stage is co-partitioned,
    // so the funnel costs one fact shuffle regardless of stage count.
    // Output is exact integers (counts + µs lag sums): no float parity
    // surface at all.
    "funnel_steps" -> ((s, dir) => {
      val ev = CoreQueries.rawEvents(s, dir)
        .select(col("user_id"), col("event_type"), col("ts_us"))
      val v = ev.where(col("event_type") === "view")
        .groupBy("user_id").agg(min(col("ts_us")).as("t1"))
      val c = ev.where(col("event_type") === "click")
        .join(v, "user_id").where(col("ts_us") > col("t1"))
        .groupBy("user_id").agg(min(col("ts_us")).as("t2"), max(col("t1")).as("t1"))
      val p = ev.where(col("event_type") === "purchase")
        .join(c, "user_id").where(col("ts_us") > col("t2"))
        .groupBy("user_id").agg(min(col("ts_us")).as("t3"), max(col("t2")).as("t2"))
      v.agg(count(lit(1)).as("n_users"), sum(lit(0L)).as("sum_lag_us"))
        .withColumn("stage", lit("1_view"))
        .unionByName(
          c.agg(count(lit(1)).as("n_users"), sum(col("t2") - col("t1")).as("sum_lag_us"))
            .withColumn("stage", lit("2_click")))
        .unionByName(
          p.agg(count(lit(1)).as("n_users"), sum(col("t3") - col("t2")).as("sum_lag_us"))
            .withColumn("stage", lit("3_purchase")))
        .select("stage", "n_users", "sum_lag_us")
        .orderBy("stage")
    }),

    // cohort retention: users grouped by first-active day, counted at
    // each later active-day offset — the (cohort, offset) matrix every
    // product-analytics engine derives from raw events. One distinct to
    // (user, day) grain, a per-user min, and one join + aggregation,
    // all keyed on user_id; output is exact integers.
    "retention_cohorts" -> ((s, dir) => {
      val e = CoreQueries.rawEvents(s, dir)
        .select(col("user_id"), expr("ts_us div 86400000000").as("day"))
        .distinct()
      val cohort = e.groupBy("user_id").agg(min(col("day")).as("cohort_day"))
      e.join(cohort, "user_id")
        .groupBy(col("cohort_day"), (col("day") - col("cohort_day")).as("offset"))
        .agg(count(lit(1)).as("n_users"))
        .orderBy("cohort_day", "offset")
    }),

    // gap-based sessionization: a window-function op (lag + running sum)
    "user_sessions" -> ((s, dir) => {
      val ev = CoreQueries.rawEvents(s, dir)
        .select(col("user_id"), col("ts_us"))
      val byUser = Window.partitionBy("user_id").orderBy("ts_us")
      ev.withColumn("prev_us", lag(col("ts_us"), 1).over(byUser))
        .withColumn("new_s",
          when(col("prev_us").isNull ||
            col("ts_us") - col("prev_us") > SessionGapUs, 1L).otherwise(0L))
        .withColumn("session_id",
          sum(col("new_s")).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy("user_id", "session_id")
        .agg(
          count(lit(1)).as("n_events"),
          min(col("ts_us")).as("start_us"),
          max(col("ts_us")).as("end_us"))
        .orderBy("user_id", "session_id")
    }))

  val oracle: Map[String, String] = Map(
    "q1_agg" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  round(sum(l_quantity), 6) AS sum_qty,
         |  round(sum(l_extendedprice), 6) AS sum_base_price,
         |  round(sum(l_extendedprice * (1 - l_discount)), 6) AS sum_disc_price,
         |  round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 6) AS sum_charge,
         |  round(avg(l_quantity), 6) AS avg_qty,
         |  count(*) AS count_order
         |FROM lineitem WHERE epoch_us(l_shipdate) <= $ShipCutoffUs
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q3_join" ->
      s"""SELECT o_orderkey, epoch_us(o_orderdate) AS order_us, o_orderpriority,
         |  round(sum(l_extendedprice * (1 - l_discount)), 6) AS revenue
         |FROM customer
         |JOIN orders ON c_custkey = o_custkey
         |JOIN lineitem ON l_orderkey = o_orderkey
         |WHERE c_mktsegment = 'BUILDING'
         |  AND epoch_us(o_orderdate) < $ShipCutoffUs
         |  AND epoch_us(l_shipdate) > $ShipCutoffUs
         |GROUP BY 1, 2, 3 ORDER BY o_orderkey""".stripMargin,
    "q4_priority" ->
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE epoch_us(o_orderdate) >= 820454400000000
        |  AND epoch_us(o_orderdate) < 828316800000000
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey
        |                AND l_shipdate > o_orderdate)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q12_modes" ->
      """SELECT l_returnflag AS mode,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
        |    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE epoch_us(l_shipdate) >= 820454400000000
        |  AND epoch_us(l_shipdate) < 852076800000000
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q14_promo" ->
      """SELECT round(100.0 *
        |    sum(CASE WHEN p_type = 'PROMO'
        |        THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END) /
        |    sum(l_extendedprice * (1 - l_discount)), 6) AS promo_revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE epoch_us(l_shipdate) >= 841536000000000
        |  AND epoch_us(l_shipdate) < 844128000000000""".stripMargin,
    "q6_filter" ->
      """SELECT round(sum(l_extendedprice * l_discount), 6) AS revenue,
        |  count(*) AS n_rows
        |FROM lineitem
        |WHERE epoch_us(l_shipdate) >= 820454400000000
        |  AND epoch_us(l_shipdate) < 852076800000000
        |  AND l_discount BETWEEN 0.05 AND 0.07
        |  AND l_quantity < 24""".stripMargin,
    "q7_volume" ->
      """SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
        |  CAST(year(l_shipdate) AS BIGINT) AS l_year,
        |  round(sum(l_extendedprice * (1 - l_discount)), 6) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation cn ON c_nationkey = cn.n_nationkey
        |JOIN nation sn ON s_nationkey = sn.n_nationkey
        |WHERE (sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
        |   OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1')
        |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    "q8_share" ->
      """SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
        |  round(sum(CASE WHEN sn.n_name = 'NATION_3'
        |      THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END) /
        |    sum(l_extendedprice * (1 - l_discount)), 6) AS mkt_share
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation cn ON c_nationkey = cn.n_nationkey
        |JOIN region ON cn.n_regionkey = r_regionkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation sn ON s_nationkey = sn.n_nationkey
        |WHERE p_type = 'PROMO' AND r_name = 'AFRICA'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q13_custdist" ->
      """WITH per_cust AS (
        |  SELECT o_custkey, count(*) AS n FROM orders GROUP BY 1),
        |cc AS (
        |  SELECT coalesce(n, 0) AS c_count
        |  FROM customer LEFT JOIN per_cust ON c_custkey = o_custkey)
        |SELECT c_count, count(*) AS custdist
        |FROM cc GROUP BY 1
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,
    "q15_topsupp" ->
      """WITH rev AS (
        |  SELECT l_suppkey,
        |    round(sum(l_extendedprice * (1 - l_discount)), 6) AS total_revenue
        |  FROM lineitem
        |  WHERE epoch_us(l_shipdate) >= 852076800000000
        |    AND epoch_us(l_shipdate) < 859852800000000
        |  GROUP BY 1)
        |SELECT s_suppkey, s_name, total_revenue
        |FROM rev JOIN supplier ON l_suppkey = s_suppkey
        |WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
        |ORDER BY s_suppkey""".stripMargin,
    "q17_smallqty" ->
      """WITH li AS (
        |  SELECT l_partkey, l_quantity, l_extendedprice
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE p_brand = 'Brand#1'),
        |cuts AS (
        |  SELECT l_partkey, 0.2 * avg(l_quantity) AS qty_cut
        |  FROM li GROUP BY 1)
        |SELECT round(sum(l_extendedprice) / 7.0, 6) AS avg_yearly,
        |  count(*) AS n_rows
        |FROM li JOIN cuts USING (l_partkey)
        |WHERE l_quantity < qty_cut""".stripMargin,
    "q19_disjunct" ->
      """SELECT round(sum(l_extendedprice * (1 - l_discount)), 6) AS revenue,
        |  count(*) AS n_rows
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
        |       AND l_quantity BETWEEN 1 AND 20)
        |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
        |       AND l_quantity BETWEEN 10 AND 30)
        |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50
        |       AND l_quantity BETWEEN 20 AND 40)""".stripMargin,
    "q22_noorders" ->
      """WITH cut AS (
        |  SELECT avg(c_acctbal) AS cut FROM customer WHERE c_acctbal > 0.0)
        |SELECT CAST(c_nationkey AS BIGINT) AS nationkey,
        |  count(*) AS numcust,
        |  round(sum(c_acctbal), 6) AS totacctbal
        |FROM customer, cut
        |WHERE c_acctbal > cut
        |  AND c_custkey NOT IN (SELECT o_custkey FROM orders)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q18_topk" ->
      """WITH big AS (
        |  SELECT l_orderkey, round(sum(l_quantity), 6) AS sum_qty
        |  FROM lineitem GROUP BY 1
        |  HAVING round(sum(l_quantity), 6) > 300)
        |SELECT c_name, c_custkey, o_orderkey,
        |  epoch_us(o_orderdate) AS order_us, o_totalprice, sum_qty
        |FROM big
        |JOIN orders ON o_orderkey = l_orderkey
        |JOIN customer ON c_custkey = o_custkey
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin,
    "k_anonymity" ->
      """SELECT c_nationkey AS nation, c_mktsegment AS segment,
        |  CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_bin,
        |  count(*) AS n, count(*) < 5 AS at_risk
        |FROM customer GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    "q10_returns" ->
      """WITH rev AS (
        |  SELECT o_custkey,
        |    round(sum(l_extendedprice * (1 - l_discount)), 6) AS revenue
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE l_returnflag = 'R'
        |    AND o_orderdate >= TIMESTAMP '1997-01-01'
        |    AND o_orderdate < TIMESTAMP '1997-04-01'
        |  GROUP BY 1)
        |SELECT c_custkey, c_name, revenue, c_acctbal, n_name
        |FROM rev
        |JOIN customer ON c_custkey = o_custkey
        |JOIN nation ON n_nationkey = c_nationkey
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,
    "fuzzy_name_match" ->
      """WITH names AS (
        |  SELECT p_name AS name, count(*) AS n_parts,
        |    string_split(p_name, ' ')[-1] AS noun
        |  FROM part GROUP BY 1)
        |SELECT a.name AS name_a, b.name AS name_b,
        |  CAST(levenshtein(a.name, b.name) AS BIGINT) AS dist,
        |  a.n_parts AS n_a, b.n_parts AS n_b
        |FROM names a JOIN names b ON a.noun = b.noun AND a.name < b.name
        |WHERE levenshtein(a.name, b.name) <= 2
        |ORDER BY 1, 2""".stripMargin,
    "orders_backlog_daily" ->
      """WITH opens AS (
        |  SELECT epoch_us(o_orderdate) // 86400000000 AS day,
        |    CAST(1 AS BIGINT) AS delta
        |  FROM orders),
        |closes AS (
        |  SELECT epoch_us(max(l_shipdate)) // 86400000000 AS day,
        |    CAST(-1 AS BIGINT) AS delta
        |  FROM lineitem GROUP BY l_orderkey),
        |d AS (SELECT day, CAST(sum(delta) AS BIGINT) AS d
        |  FROM (SELECT * FROM opens UNION ALL SELECT * FROM closes)
        |  GROUP BY 1)
        |SELECT day, CAST(sum(d) OVER (ORDER BY day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |  AS n_open
        |FROM d ORDER BY day""".stripMargin,
    "supplier_pareto" ->
      """WITH sup AS (SELECT s_suppkey,
        |    CAST(round(s_acctbal * 100) AS BIGINT) AS cents
        |  FROM supplier),
        |n AS (SELECT count(*) AS nn, CAST(sum(cents) AS BIGINT) AS tot
        |      FROM sup),
        |r AS (SELECT cents, tot,
        |    row_number() OVER (ORDER BY cents DESC, s_suppkey) AS rk, nn
        |  FROM sup, n),
        |g AS (SELECT ((rk - 1) * 10) // nn AS decile,
        |    CAST(sum(cents) AS BIGINT) AS dc, max(tot) AS tot,
        |    count(*) AS n_suppliers
        |  FROM r GROUP BY 1)
        |SELECT decile, n_suppliers, dc AS cents,
        |  (1000000 * CAST(sum(dc) OVER (ORDER BY decile
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT))
        |    // tot AS cum_share_ppm
        |FROM g ORDER BY decile""".stripMargin,
    "bloom_semi_join" ->
      """SELECT round(sum(l_extendedprice * (1 - l_discount)), 6) AS revenue,
        |  count(*) AS n_rows
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderpriority = '1-URGENT'""".stripMargin,
    "salted_topk" ->
      """SELECT event_type, event_id, value, rank FROM (
        |  SELECT event_type, event_id, value,
        |    row_number() OVER (PARTITION BY event_type
        |      ORDER BY value DESC, event_id) AS rank
        |  FROM events WHERE value IS NOT NULL AND NOT isnan(value))
        |WHERE rank <= 5 ORDER BY event_type, rank""".stripMargin,
    "cube_revenue" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_extendedprice * (1 - l_discount)), 6) AS revenue,
        |  count(*) AS n_rows
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q5_join" ->
      """SELECT n_name,
        |  round(sum(l_extendedprice * (1 - l_discount)), 6) AS revenue,
        |  count(*) AS n_rows
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1997-01-01'
        |  AND o_orderdate < TIMESTAMP '1999-01-01'
        |  AND c_nationkey = s_nationkey
        |GROUP BY 1 ORDER BY revenue DESC, n_name""".stripMargin,
    // tie-break mirrors asofBackward's running max(struct(ts, id)):
    // latest ts first, then MAX event_id among equal-ts views — a
    // two-step max avoids arg_max, whose tie choice is unspecified
    // arg_max/arg_min on (v_us) mirror Spark's struct-max tie rule:
    // equal v_us ⇒ equal age ⇒ equal w, so ties cannot diverge
    "attribution_decay" ->
      """WITH p AS (SELECT event_id AS p_id, user_id, epoch_us(ts) AS p_us
        |  FROM events WHERE event_type = 'purchase'),
        |v AS (SELECT user_id, epoch_us(ts) AS v_us
        |  FROM events WHERE event_type = 'view'),
        |j AS (SELECT p_id, v_us, (p_us - v_us) // 1000000 AS age_s
        |  FROM p JOIN v USING (user_id)
        |  WHERE v_us <= p_us AND v_us >= p_us - 3000000000),
        |w AS (SELECT p_id, v_us, 1000000 // (1 + age_s // 600) AS w FROM j),
        |a AS (SELECT p_id, count(*) AS n_touches,
        |    CAST(sum(w) AS BIGINT) AS sum_w,
        |    arg_max(w, v_us) AS last_w, arg_min(w, v_us) AS first_w
        |  FROM w GROUP BY 1)
        |SELECT p_id, n_touches,
        |  (1000000 * last_w) // sum_w AS last_share_ppm,
        |  (1000000 * first_w) // sum_w AS first_share_ppm
        |FROM a ORDER BY p_id""".stripMargin,
    "asof_attribution" ->
      """WITH p AS (SELECT event_id AS p_id, user_id, epoch_us(ts) AS p_us
        |           FROM events WHERE event_type = 'purchase'),
        |v AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us
        |      FROM events WHERE event_type = 'view'),
        |m AS (
        |  SELECT p.p_id, p.user_id, p.p_us, max(v.ts_us) AS v_us
        |  FROM p LEFT JOIN v ON v.user_id = p.user_id AND v.ts_us <= p.p_us
        |  GROUP BY 1, 2, 3)
        |SELECT m.p_id, m.user_id, m.p_us,
        |  max(v.event_id) AS v_id, m.v_us, m.p_us - m.v_us AS gap_us
        |FROM m LEFT JOIN v ON v.user_id = m.user_id AND v.ts_us = m.v_us
        |GROUP BY 1, 2, 3, 5, 6 ORDER BY p_id""".stripMargin,
    // mirrors asofForward's running min(struct(ts, id)): earliest
    // ts >= p_us first, then MIN event_id among equal-ts views
    "asof_next" ->
      """WITH p AS (SELECT event_id AS p_id, user_id, epoch_us(ts) AS p_us
        |           FROM events WHERE event_type = 'purchase'),
        |v AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us
        |      FROM events WHERE event_type = 'view'),
        |m AS (
        |  SELECT p.p_id, p.user_id, p.p_us, min(v.ts_us) AS v_us
        |  FROM p LEFT JOIN v ON v.user_id = p.user_id AND v.ts_us >= p.p_us
        |  GROUP BY 1, 2, 3)
        |SELECT m.p_id, m.user_id, m.p_us,
        |  min(v.event_id) AS v_id, m.v_us, m.v_us - m.p_us AS gap_us
        |FROM m LEFT JOIN v ON v.user_id = m.user_id AND v.ts_us = m.v_us
        |GROUP BY 1, 2, 3, 5 ORDER BY p_id""".stripMargin,
    // argmin(|Δt|) per comment with (diff, ts, value) tie-break —
    // identical lexicographic order to the engine's struct min
    "comments_asof_nearest" ->
      """WITH e AS (SELECT event_type AS dataset_id, epoch_us(ts) AS ts_us,
        |           value FROM events
        |           WHERE value IS NOT NULL AND NOT isnan(value)),
        |c AS (SELECT dataset_id, ts_us + 300000 AS date_us FROM e
        |      WHERE ('0x' || substr(md5(dataset_id || '|' ||
        |        CAST(ts_us AS VARCHAR)), 1, 15))::BIGINT % 401 = 0),
        |j AS (SELECT c.dataset_id, c.date_us, e.ts_us, e.value,
        |        abs(e.ts_us - c.date_us) AS diff_us
        |      FROM c JOIN e USING (dataset_id)),
        |r AS (SELECT *, row_number() OVER (PARTITION BY dataset_id, date_us
        |        ORDER BY diff_us, ts_us, value) AS rn FROM j)
        |SELECT dataset_id, date_us, diff_us, ts_us, value FROM r
        |WHERE rn = 1 ORDER BY dataset_id, date_us""".stripMargin,
    "sliding_60s_15s" ->
      """SELECT event_type AS dataset_id,
        |  (epoch_us(ts) // 15000000 - t.j) * 15 AS win_s,
        |  min(value) AS min_v, max(value) AS max_v,
        |  round(sum(value), 6) AS sum_v, count(*) AS cnt
        |FROM events CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS j) t
        |WHERE value IS NOT NULL AND NOT isnan(value)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "topk_per_user" ->
      """SELECT user_id, event_id, value, rank FROM (
        |  SELECT user_id, event_id, value,
        |    row_number() OVER (PARTITION BY user_id
        |                       ORDER BY value DESC, event_id) AS rank
        |  FROM events WHERE value IS NOT NULL AND NOT isnan(value))
        |WHERE rank <= 3 ORDER BY user_id, rank""".stripMargin,
    "range_join_30s" ->
      """WITH p AS (SELECT event_id AS p_id, epoch_us(ts) AS p_us
        |           FROM events WHERE event_type = 'purchase'),
        |v AS (SELECT epoch_us(ts) AS v_us FROM events WHERE event_type = 'view'),
        |c AS (
        |  SELECT p.p_id, count(*) AS n_views_30s,
        |    min(abs(p.p_us - v.v_us)) AS min_gap_us
        |  FROM p JOIN v ON abs(p.p_us - v.v_us) <= 30000000
        |  GROUP BY 1)
        |SELECT p.p_id, p.p_us,
        |  coalesce(c.n_views_30s, 0) AS n_views_30s, c.min_gap_us
        |FROM p LEFT JOIN c USING (p_id) ORDER BY p_id""".stripMargin,
    "funnel_steps" ->
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events),
        |v AS (SELECT user_id, min(ts_us) AS t1 FROM e
        |      WHERE event_type = 'view' GROUP BY 1),
        |c AS (SELECT e.user_id, min(ts_us) AS t2, max(t1) AS t1
        |      FROM e JOIN v USING (user_id)
        |      WHERE event_type = 'click' AND ts_us > t1 GROUP BY 1),
        |p AS (SELECT e.user_id, min(ts_us) AS t3, max(t2) AS t2
        |      FROM e JOIN c USING (user_id)
        |      WHERE event_type = 'purchase' AND ts_us > t2 GROUP BY 1)
        |SELECT '1_view' AS stage, count(*) AS n_users,
        |  CAST(0 AS BIGINT) AS sum_lag_us FROM v
        |UNION ALL SELECT '2_click', count(*), CAST(sum(t2 - t1) AS BIGINT) FROM c
        |UNION ALL SELECT '3_purchase', count(*), CAST(sum(t3 - t2) AS BIGINT) FROM p
        |ORDER BY stage""".stripMargin,
    "retention_cohorts" ->
      """WITH e AS (
        |  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day FROM events),
        |c AS (SELECT user_id, min(day) AS cohort_day FROM e GROUP BY 1)
        |SELECT cohort_day, day - cohort_day AS offset, count(*) AS n_users
        |FROM e JOIN c USING (user_id)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "user_sessions" ->
      s"""WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us FROM events),
         |d AS (
         |  SELECT user_id, ts_us,
         |    CASE WHEN lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us) IS NULL
         |           OR ts_us - lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us)
         |              > $SessionGapUs
         |         THEN 1 ELSE 0 END AS new_s
         |  FROM e),
         |s AS (
         |  SELECT user_id, ts_us,
         |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts_us
         |                     ROWS UNBOUNDED PRECEDING) AS session_id
         |  FROM d)
         |SELECT user_id, CAST(session_id AS BIGINT) AS session_id, count(*) AS n_events,
         |  min(ts_us) AS start_us, max(ts_us) AS end_us
         |FROM s GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)
}
