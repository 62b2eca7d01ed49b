package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}
import graft.functions.ColUtil._

/** Analytics query surface over the star schema — the read side the
  * reference serves from its warehouse (docs/ queries + the measures its
  * fact builders precompute). All money math on DECIMAL for exactness.
  */
object Analytics {

  private def netDec = (money(col("l_extendedprice")) * oneMinus(col("l_discount")))
    .cast(DecimalType(14, 4))

  /** TPC-H Q1-shaped pricing summary: flag/status rollup with exact sums. */
  def pricingSummary(lineitem: DataFrame): DataFrame =
    lineitem
      .filter(to_date(col("l_shipdate")) <= lit("2000-12-01").cast("date"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        dbl(sum(money(col("l_quantity")))).as("sum_qty"),
        dbl(sum(money(col("l_extendedprice")))).as("sum_base_price"),
        dbl(sum(netDec)).as("sum_disc_price"),
        dbl(sum((netDec * onePlus(col("l_tax"))).cast(DecimalType(19, 6)))).as("sum_charge"),
        (dbl(sum(money(col("l_quantity")))) / count(lit(1))).as("avg_qty"),
        (dbl(sum(money(col("l_extendedprice")))) / count(lit(1))).as("avg_price"),
        (dbl(sum(rate(col("l_discount")))) / count(lit(1))).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** TPC-H Q3-shaped: top-10 unshipped orders by revenue for a segment. */
  def topUnshipped(lineitem: DataFrame, orders: DataFrame, customer: DataFrame): DataFrame =
    lineitem
      .filter(to_date(col("l_shipdate")) > lit("1998-01-01").cast("date"))
      .join(orders.filter(to_date(col("o_orderdate")) < lit("1998-01-01").cast("date")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(customer.filter(col("c_mktsegment") === "BUILDING")
        .select("c_custkey")), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), to_date(col("o_orderdate")).as("order_date"),
        col("o_orderpriority"))
      .agg(dbl(sum(netDec)).as("revenue"))
      .orderBy(col("revenue").desc, col("order_date"), col("l_orderkey"))
      .limit(10)

  /** TPC-H Q5-shaped: revenue by nation for one region/date window,
    * customer and supplier co-national. Nation/region broadcast.
    */
  def regionVolume(lineitem: DataFrame, orders: DataFrame, customer: DataFrame,
                   supplier: DataFrame, nation: DataFrame, region: DataFrame): DataFrame =
    lineitem
      .join(orders.filter(to_date(col("o_orderdate")).between("1996-01-01", "1997-12-31")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(customer.select("c_custkey", "c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(supplier.select("s_suppkey", "s_nationkey")),
        col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(region.filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(dbl(sum(netDec)).as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))

  /** Top-25 customers by lifetime revenue with rank. */
  def topCustomers(lineitem: DataFrame, orders: DataFrame, customer: DataFrame): DataFrame = {
    val rev = lineitem
      .join(orders.select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_custkey")
      .agg(dbl(sum(netDec)).as("revenue"), count(lit(1)).as("n_lines"))
    rev.join(broadcast(customer.select("c_custkey", "c_name", "c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(25)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("revenue").desc, col("c_custkey"))).cast("long"))
      .select("rank", "c_custkey", "c_name", "c_mktsegment", "revenue", "n_lines")
      .orderBy("rank")
  }

  /** Top-3 parts per brand by retail price (windowed top-k per group). */
  def topkPerBrand(part: DataFrame): DataFrame = {
    val w = Window.partitionBy("p_brand")
      .orderBy(col("p_retailprice").desc, col("p_partkey"))
    part.withColumn("brand_rank", row_number().over(w).cast("long"))
      .filter(col("brand_rank") <= 3)
      .select("p_brand", "brand_rank", "p_partkey", "p_name", "p_retailprice")
      .orderBy("p_brand", "brand_rank")
  }

  /** Monthly revenue + cumulative running total (window over ordered
    * months; exact decimal window sums).
    */
  def runningMonthlyRevenue(orders: DataFrame): DataFrame = {
    val monthly = orders
      .groupBy(trunc(to_date(col("o_orderdate")), "month").as("month"))
      .agg(count(lit(1)).as("n_orders"),
        sum(money(col("o_totalprice"))).as("rev_dec"))
    val w = Window.orderBy("month").rowsBetween(Window.unboundedPreceding, 0)
    monthly
      .select(col("month"), col("n_orders"), dbl(col("rev_dec")).as("revenue"),
        dbl(sum(col("rev_dec")).over(w)).as("cumulative_revenue"))
      .orderBy("month")
  }

  /** RFM segmentation (Hughes 1994): per-customer recency/frequency/
    * monetary quartile scores and the concatenated segment code — the
    * canonical retail customer-scoring table. Recency is days since
    * the customer's last order measured against the CORPUS max date
    * (reproducible — wall-clock "today" would change every run) and
    * its quartile is inverted so recent buyers score 4. All three
    * ntiles run over the CUSTOMER AGGREGATE (the customer_value_tiers
    * global-window honesty: input is pre-aggregated, one row per
    * customer; at extreme scale swap in the bucketed-boundary form
    * [[customerValueTiersBucketed]] demonstrates); tie-break on
    * custkey keeps bucket assignment deterministic in both engines.
    */
  def rfmSegments(orders: DataFrame): DataFrame = {
    val maxDate = orders.agg(max(to_date(col("o_orderdate"))).as("max_date"))
    val cust = orders.groupBy(col("o_custkey"))
      .agg(max(to_date(col("o_orderdate"))).as("last_order"),
        count(lit(1)).as("frequency"),
        dbl(sum(money(col("o_totalprice")))).as("monetary"))
      .crossJoin(broadcast(maxDate)) // 1-row scalar
      .withColumn("recency_days",
        datediff(col("max_date"), col("last_order")).cast("long"))
    val wr = Window.orderBy(col("recency_days").desc, col("o_custkey"))
    val wf = Window.orderBy(col("frequency"), col("o_custkey"))
    val wm = Window.orderBy(col("monetary"), col("o_custkey"))
    cust
      .withColumn("r_score", ntile(4).over(wr).cast("long"))
      .withColumn("f_score", ntile(4).over(wf).cast("long"))
      .withColumn("m_score", ntile(4).over(wm).cast("long"))
      .withColumn("segment", concat(col("r_score").cast("string"),
        col("f_score").cast("string"), col("m_score").cast("string")))
      .select("o_custkey", "recency_days", "frequency", "monetary",
        "r_score", "f_score", "m_score", "segment")
      .orderBy("o_custkey")
  }

  /** Market-basket pair mining: the top co-occurring part pairs across
    * order baskets, with support counts and lift — the affinity
    * report behind every "bought together" merchandising decision.
    * lift = n_pair·N/(n_a·n_b) stays a single division of exact
    * integer products (the tf-idf rational-score discipline), so the
    * double is engine-identical.
    *
    * Scale shape: the pair generation is a self-join keyed on
    * l_orderkey — fan-out is BOUNDED BY BASKET SIZE (≤ lines-per-order
    * choose 2, a schema constant ~21, never corpus-driven), unlike a
    * part-keyed join that would explode on popular parts; pair and
    * support aggregates map-side combine; supports join back onto the
    * pair counts (part-keyed, uniform — every part appears once per
    * side post-aggregation); top-k via TakeOrdered, the rank window
    * running over the k collected rows only.
    */
  def basketPairs(lineitem: DataFrame, topK: Int = 100): DataFrame = {
    val items = lineitem.select(col("l_orderkey"), col("l_partkey")).distinct()
    val nOrders = items.select(countDistinct(col("l_orderkey")).as("n_orders"))
    val supp = items.groupBy(col("l_partkey")).agg(count(lit(1)).as("n_part"))
    val pairs = items.toDF("l_orderkey", "part_a")
      .join(items.toDF("l_orderkey", "part_b"), Seq("l_orderkey"))
      .filter(col("part_a") < col("part_b"))
      .groupBy("part_a", "part_b").agg(count(lit(1)).as("n_pair"))
    val top = pairs
      .join(supp.toDF("part_a", "n_a"), Seq("part_a"))
      .join(supp.toDF("part_b", "n_b"), Seq("part_b"))
      .crossJoin(broadcast(nOrders)) // 1-row scalar
      .withColumn("lift",
        (col("n_pair") * col("n_orders")).cast("double") /
          (col("n_a") * col("n_b")).cast("double"))
      .orderBy(col("n_pair").desc, col("part_a"), col("part_b"))
      .limit(topK)
    val w = Window.orderBy(col("n_pair").desc, col("part_a"), col("part_b"))
    top.withColumn("rank", row_number().over(w).cast("long"))
      .select("rank", "part_a", "part_b", "n_pair", "n_a", "n_b", "lift")
      .orderBy("rank")
  }

  /** Cohort retention/LTV matrix: cohort = month of the customer's
    * FIRST order; cell (cohort_month, months_since) = distinct active
    * customers, retention share vs cohort size, and exact-decimal
    * revenue — the acquisition-cohort report every subscription/retail
    * warehouse publishes. months_since is pure integer year/month
    * arithmetic (no engine-specific month-diff semantics to drift);
    * retention is one division of exact longs; revenue is the
    * shuffle-order-independent DECIMAL sum cast once at the end.
    *
    * Scale shape: first-order aggregate keyed on the uniform custkey
    * (map-side partials), joined back on the same key (AQE may
    * broadcast the customer-sized side or keep a keyed shuffle join —
    * either is safe); the cell rollup output is bounded by
    * months × months, and the cohort-size join is metadata-scale.
    */
  def cohortRetention(orders: DataFrame, maxMonths: Int = 12): DataFrame = {
    val first = orders
      .groupBy(col("o_custkey"))
      .agg(min(trunc(to_date(col("o_orderdate")), "month")).as("cohort_month"))
    val sized = first.groupBy("cohort_month")
      .agg(countDistinct(col("o_custkey")).as("cohort_size"))
    val monthsSince =
      ((year(col("order_month")) * 12 + month(col("order_month"))) -
        (year(col("cohort_month")) * 12 + month(col("cohort_month")))).cast("long")
    orders
      .select(col("o_custkey"),
        trunc(to_date(col("o_orderdate")), "month").as("order_month"),
        money(col("o_totalprice")).as("tp"))
      .join(first, Seq("o_custkey"))
      .withColumn("months_since", monthsSince)
      .filter(col("months_since") < maxMonths)
      .groupBy("cohort_month", "months_since")
      .agg(countDistinct(col("o_custkey")).as("n_active"),
        dbl(sum(col("tp"))).as("revenue"))
      .join(broadcast(sized), Seq("cohort_month"))
      .select(col("cohort_month"), col("months_since"), col("cohort_size"),
        col("n_active"),
        (col("n_active").cast("double") / col("cohort_size").cast("double"))
          .as("retention"),
        col("revenue"))
      .orderBy("cohort_month", "months_since")
  }

  /** ROLLUP(year, priority) with sentinel display values (-1 / 'ALL')
    * so ordering is NULL-free and engine-portable.
    */
  def rollupSales(orders: DataFrame): DataFrame =
    orders
      .select(year(to_date(col("o_orderdate"))).as("yr"),
        col("o_orderpriority").as("prio"), money(col("o_totalprice")).as("tp"))
      .rollup("yr", "prio")
      .agg(grouping(col("yr")).as("g_year"), grouping(col("prio")).as("g_prio"),
        count(lit(1)).as("n_orders"), dbl(sum(col("tp"))).as("revenue"))
      .select(
        when(col("g_year") === 1, -1).otherwise(col("yr")).cast("long").as("year_d"),
        when(col("g_prio") === 1, "ALL").otherwise(col("prio")).as("priority_d"),
        col("n_orders"), col("revenue"))
      .orderBy("year_d", "priority_d")

  /** Status × priority matrix via conditional aggregation (engine-
    * portable pivot; a `.pivot` variant is spec-only).
    */
  def pivotStatusPriority(orders: DataFrame): DataFrame = {
    def cnt(p: String) = count(when(col("o_orderpriority") === p, 1))
    def rev(p: String) =
      dbl(coalesce(sum(when(col("o_orderpriority") === p, money(col("o_totalprice")))),
        lit(0).cast(DecimalType(12, 2))))
    orders.groupBy("o_orderstatus").agg(
        cnt("1-URGENT").as("n_urgent"), rev("1-URGENT").as("rev_urgent"),
        cnt("2-HIGH").as("n_high"), rev("2-HIGH").as("rev_high"),
        cnt("3-MEDIUM").as("n_medium"), rev("3-MEDIUM").as("rev_medium"),
        cnt("4-NOT SPECIFIED").as("n_notspec"), rev("4-NOT SPECIFIED").as("rev_notspec"),
        cnt("5-LOW").as("n_low"), rev("5-LOW").as("rev_low"))
      .orderBy("o_orderstatus")
  }

  /** TPC-H Q7-shaped: bilateral trade volume between two nations by
    * year (customer nation ↔ supplier nation, both directions).
    */
  def nationTrade(lineitem: DataFrame, orders: DataFrame, customer: DataFrame,
                  supplier: DataFrame, nation: DataFrame,
                  n1: String = "NATION_1", n2: String = "NATION_2"): DataFrame = {
    val cn = nation.select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
    val sn = nation.select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
    lineitem
      .join(orders.select("o_orderkey", "o_custkey"), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(customer.select("c_custkey", "c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(supplier.select("s_suppkey", "s_nationkey")),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(cn), col("c_nationkey") === col("c_nk"))
      .join(broadcast(sn), col("s_nationkey") === col("s_nk"))
      .filter((col("cust_nation") === n1 && col("supp_nation") === n2) ||
        (col("cust_nation") === n2 && col("supp_nation") === n1))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(to_date(col("l_shipdate"))).cast("long").as("ship_year"))
      .agg(dbl(sum(netDec)).as("revenue"), count(lit(1)).as("n_lines"))
      .orderBy("supp_nation", "cust_nation", "ship_year")
  }

  /** TPC-H Q14-shaped: promo revenue share per ship-month (conditional
    * aggregation ratio; exact decimal sums then one double division).
    */
  def promoShare(lineitem: DataFrame, part: DataFrame): DataFrame =
    lineitem
      .join(broadcast(part.select(col("p_partkey"),
        col("p_type").startsWith("PROMO").as("is_promo"))),
        col("l_partkey") === col("p_partkey"))
      .groupBy(trunc(to_date(col("l_shipdate")), "month").as("ship_month"))
      .agg(
        dbl(coalesce(sum(when(col("is_promo"), netDec)),
          lit(0).cast(DecimalType(14, 4)))).as("promo_revenue"),
        dbl(sum(netDec)).as("total_revenue"),
        count(lit(1)).as("n_lines"))
      .withColumn("promo_pct",
        lit(100.0) * col("promo_revenue") / col("total_revenue"))
      .orderBy("ship_month")

  /** TPC-H Q22-shaped: well-funded customers (balance above the global
    * positive mean) gone dormant — no order in the trailing 24 months
    * of the order history. Two broadcast scalars (mean balance, the
    * dormancy cutoff) + anti join against the recent-order keys. (The
    * literal Q22 "never ordered" predicate is empty on this data —
    * every customer has orders — which made the checked result a 0-row
    * hash; the windowed dormancy keeps the shape and produces a real
    * per-segment rollup.)
    */
  def dormantRichCustomers(customer: DataFrame, orders: DataFrame): DataFrame = {
    val avgPos = customer.filter(col("c_acctbal") > 0)
      .agg((dbl(sum(money(col("c_acctbal")))) / count(lit(1))).as("avg_bal"))
    val cutoff = orders
      .agg(add_months(max(to_date(col("o_orderdate"))), -24).as("cutoff"))
    val recent = orders.join(broadcast(cutoff))
      .filter(to_date(col("o_orderdate")) >= col("cutoff"))
      .select("o_custkey")
    customer
      .join(broadcast(avgPos))
      .filter(col("c_acctbal") > col("avg_bal"))
      .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_customers"),
        dbl(sum(money(col("c_acctbal")))).as("total_balance"))
      .orderBy("c_mktsegment")
  }

  /** Customer value segmentation: lifetime order value → quartile tier
    * (ntile) + exact percentile rank. One shuffle for the groupBy, then
    * a GLOBAL window over the per-customer aggregate.
    *
    * Scale caveat: an unpartitioned window collapses to one task. Fine
    * while |customers| ≪ |facts| (the aggregate is millions of rows at
    * 100 TB fact scale, single-task sortable); beyond that, swap the
    * ntile for bucketing against approxQuantile boundaries — exactness
    * of the tier boundary is the only thing traded.
    */
  def customerValueTiers(orders: DataFrame): DataFrame = {
    val rev = orders.groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"), sum(money(col("o_totalprice"))).as("rev_dec"))
    val w = Window.orderBy(col("rev_dec").desc, col("o_custkey"))
    rev.select(col("o_custkey"), col("n_orders"), dbl(col("rev_dec")).as("revenue"),
        ntile(4).over(w).cast("long").as("value_tier"),
        percent_rank().over(w).as("pct_rank"))
      .orderBy("o_custkey")
  }

  /** The 100 TB path for [[customerValueTiers]]: quartile boundaries
    * come from approxQuantile (a driver-side handful of doubles;
    * Greenwald–Khanna sketch, distributed, no global sort) and the tier
    * is a per-row comparison against them — no unpartitioned window,
    * no single-task sort anywhere in the plan. Trades only boundary-tie
    * placement vs the exact ntile (all ties of a boundary value land in
    * the lower tier); spec quantifies the agreement.
    */
  def customerValueTiersBucketed(orders: DataFrame,
                                 relErr: Double = 0.0): DataFrame = {
    val rev = orders.groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"),
        dbl(sum(money(col("o_totalprice")))).as("revenue"))
    val Array(q25, q50, q75) =
      rev.stat.approxQuantile("revenue", Array(0.25, 0.5, 0.75), relErr)
    rev.select(col("o_custkey"), col("n_orders"), col("revenue"),
        when(col("revenue") > lit(q75), 1L)
          .when(col("revenue") > lit(q50), 2L)
          .when(col("revenue") > lit(q25), 3L)
          .otherwise(4L).as("value_tier"))
      .orderBy("o_custkey")
  }

  /** TPC-H Q4-shaped: orders with at least one line shipped >60 days
    * after the order date, counted per priority (EXISTS semi-join).
    */
  def latePriorityCount(lineitem: DataFrame, orders: DataFrame): DataFrame =
    orders
      .join(lineitem.select(col("l_orderkey"), to_date(col("l_shipdate")).as("sd")),
        col("o_orderkey") === col("l_orderkey") &&
          col("sd") > date_add(to_date(col("o_orderdate")), 60),
        "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_late_orders"))
      .orderBy("o_orderpriority")

  /** TPC-H Q18-shaped: large-volume orders (Σqty > threshold via
    * HAVING), joined back to the customer, top-100 by value.
    */
  def bigOrders(lineitem: DataFrame, orders: DataFrame, customer: DataFrame,
                minQty: Double = 130.0): DataFrame = {
    val q = lineitem.groupBy(col("l_orderkey"))
      .agg(sum(money(col("l_quantity"))).as("qty_dec"))
      .filter(col("qty_dec") > minQty)
    orders.join(q, col("o_orderkey") === col("l_orderkey"))
      .join(broadcast(customer.select("c_custkey", "c_name")),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        to_date(col("o_orderdate")).as("order_date"), col("o_totalprice"),
        dbl(col("qty_dec")).as("sum_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(100)
  }

  /** Per-customer order cadence: order sequence numbers and day gaps
    * between consecutive orders (lag window; one shuffle on custkey).
    */
  def orderGaps(orders: DataFrame): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy(col("order_date"), col("o_orderkey"))
    orders
      .select(col("o_custkey"), to_date(col("o_orderdate")).as("order_date"),
        col("o_orderkey"))
      .withColumn("order_n", row_number().over(w).cast("long"))
      .withColumn("gap_days",
        datediff(col("order_date"), lag(col("order_date"), 1).over(w)).cast("long"))
      .select("o_custkey", "order_n", "o_orderkey", "order_date", "gap_days")
      .orderBy("o_custkey", "order_n")
  }

  /** Exact p50/p90/p99 of order value per priority (reference computes
    * distribution stats during validation; exact percentile = sort-based).
    */
  def orderValuePercentiles(orders: DataFrame): DataFrame =
    orders.groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_orders"),
        expr("round(percentile(o_totalprice, 0.5), 2)").as("p50"),
        expr("round(percentile(o_totalprice, 0.9), 2)").as("p90"),
        expr("round(percentile(o_totalprice, 0.99), 2)").as("p99"))
      .orderBy("o_orderpriority")

  /** The 100 TB path for [[orderValuePercentiles]]: percentile_approx
    * (t-digest-style sketch, bounded memory per group) instead of the
    * exact sort-based `percentile`, whose aggregation buffer holds
    * EVERY group value — 10⁸⁺ rows per buffer at fact scale. Accuracy
    * 10⁴ bounds the rank error to ~0.01 %; spec quantifies agreement
    * with the exact form. The exact variant stays registered for the
    * oracle (sketch merge order is engine-specific, so the approx form
    * is not hash-comparable).
    */
  def orderValuePercentilesApprox(orders: DataFrame,
                                  accuracy: Int = 10000): DataFrame =
    orders.groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_orders"),
        expr(s"round(approx_percentile(o_totalprice, 0.5, $accuracy), 2)").as("p50"),
        expr(s"round(approx_percentile(o_totalprice, 0.9, $accuracy), 2)").as("p90"),
        expr(s"round(approx_percentile(o_totalprice, 0.99, $accuracy), 2)").as("p99"))
      .orderBy("o_orderpriority")

  /** TPC-H Q6-shaped: revenue uplift from a discount band in one year —
    * a pure filtered aggregate; the whole query is scan + map-side
    * partial sum, the cheapest possible shape.
    */
  def forecastRevenue(lineitem: DataFrame, year: Int = 1996,
                      discLo: Double = 0.02, discHi: Double = 0.04,
                      maxQty: Double = 24): DataFrame =
    lineitem
      .filter(org.apache.spark.sql.functions.year(to_date(col("l_shipdate"))) === year &&
        rate(col("l_discount")).between(discLo, discHi) &&
        col("l_quantity") < maxQty)
      .agg(count(lit(1)).as("n_lines"),
        dbl(sum((money(col("l_extendedprice")) * rate(col("l_discount")))
          .cast(DecimalType(19, 6)))).as("revenue_uplift"))

  /** TPC-H Q10-shaped: customers ranked by revenue lost to returned
    * items in a quarter (returnflag = 'R'), top-20 with geography.
    */
  def returnedRevenue(lineitem: DataFrame, orders: DataFrame, customer: DataFrame,
                      nation: DataFrame, qStart: String = "1996-01-01",
                      qEnd: String = "1996-04-01"): DataFrame =
    lineitem.filter(col("l_returnflag") === "R")
      .join(orders.filter(to_date(col("o_orderdate")) >= lit(qStart) &&
          to_date(col("o_orderdate")) < lit(qEnd))
        .select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey"))
      .agg(sum(netDec).as("lost_dec"), count(lit(1)).as("n_return_lines"))
      .join(broadcast(customer.select("c_custkey", "c_name", "c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation.select("n_nationkey", "n_name")),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("c_name"), col("n_name").as("nation"),
        dbl(col("lost_dec")).as("lost_revenue"), col("n_return_lines"))
      .orderBy(col("lost_revenue").desc, col("c_custkey"))
      .limit(20)

  /** TPC-H Q12-shaped (shipmode → returnflag adapted): per return flag,
    * how many high- vs low-priority orders shipped late. Conditional
    * aggregation over one join.
    */
  def latenessByFlag(lineitem: DataFrame, orders: DataFrame): DataFrame =
    lineitem
      .join(orders.select("o_orderkey", "o_orderdate", "o_orderpriority"),
        col("l_orderkey") === col("o_orderkey"))
      .filter(to_date(col("l_shipdate")) > date_add(to_date(col("o_orderdate")), 30))
      .groupBy(col("l_returnflag"))
      .agg(count(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1))
          .as("n_high_priority_late"),
        count(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1))
          .as("n_low_priority_late"))
      .orderBy("l_returnflag")

  /** TPC-H Q19-shaped: revenue from disjunctive (brand × size × qty)
    * brackets — the predicate-pushdown stress shape; the OR of brackets
    * is one scan with the disjunction pushed to the join filter.
    */
  def bracketRevenue(lineitem: DataFrame, part: DataFrame): DataFrame = {
    val j = lineitem.join(broadcast(part.select("p_partkey", "p_brand", "p_size")),
      col("l_partkey") === col("p_partkey"))
    val bracket1 = col("p_brand") === "Brand#1" && col("p_size").between(1, 15) &&
      col("l_quantity").between(1, 20)
    val bracket2 = col("p_brand") === "Brand#2" && col("p_size").between(10, 30) &&
      col("l_quantity").between(10, 30)
    val bracket3 = col("p_brand") === "Brand#3" && col("p_size").between(20, 50) &&
      col("l_quantity").between(20, 40)
    j.filter(bracket1 || bracket2 || bracket3)
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_lines"), dbl(sum(netDec)).as("revenue"))
      .orderBy("p_brand")
  }

  /** Supplier scorecard: per-supplier delivery KPIs — shipped volume,
    * revenue, on-time rate (≤30 days from order), distinct parts
    * served. One fact-side shuffle (the orderkey join) then a grouped
    * conditional aggregation; dims broadcast.
    */
  def supplierScorecard(lineitem: DataFrame, orders: DataFrame,
                        supplier: DataFrame): DataFrame = {
    val net = (money(col("l_extendedprice")) * oneMinus(col("l_discount")))
      .cast(DecimalType(14, 4))
    lineitem
      .join(orders.select("o_orderkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_suppkey"))
      .agg(count(lit(1)).as("n_lines"),
        countDistinct(col("l_partkey")).as("n_parts"),
        dbl(sum(net)).as("revenue"),
        count(when(to_date(col("l_shipdate")) <=
          date_add(to_date(col("o_orderdate")), 30), 1)).as("n_on_time"))
      .withColumn("on_time_rate",
        col("n_on_time").cast("double") / col("n_lines"))
      .join(broadcast(supplier.select("s_suppkey", "s_name", "s_acctbal")),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("n_lines"), col("n_parts"),
        col("revenue"), col("n_on_time"), col("on_time_rate"), col("s_acctbal"))
      .orderBy("s_suppkey")
  }

  /** TPC-H Q13-shaped: customer distribution by order count, zero
    * included (left join ← the whole point of Q13), then the histogram
    * of counts.
    */
  def customerOrderDistribution(customer: DataFrame, orders: DataFrame): DataFrame =
    customer.select(col("c_custkey"))
      .join(orders.select("o_orderkey", "o_custkey"),
        col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("n_customers"))
      .orderBy(col("n_customers").desc, col("c_count").desc)

  /** TPC-H Q21-shaped: suppliers who kept a multi-supplier order
    * waiting — their line shipped late (>90 days after the order) while
    * every other supplier on the order shipped on time. Two aggregates
    * per order (distinct suppliers, distinct late suppliers) joined
    * back to the late lines; top-20 offenders.
    */
  def waitingSuppliers(lineitem: DataFrame, orders: DataFrame,
                       supplier: DataFrame, lateDays: Int = 90): DataFrame = {
    val lines = lineitem
      .join(orders.select("o_orderkey", "o_orderdate", "o_orderstatus"),
        col("l_orderkey") === col("o_orderkey"))
      .filter(col("o_orderstatus") === "F")
      .select(col("l_orderkey"), col("l_suppkey"),
        (to_date(col("l_shipdate")) >
          date_add(to_date(col("o_orderdate")), lateDays)).as("is_late"))
    val perOrder = lines.groupBy(col("l_orderkey").as("ok"))
      .agg(countDistinct(col("l_suppkey")).as("n_supp"),
        countDistinct(when(col("is_late"), col("l_suppkey"))).as("n_late_supp"))
    lines.filter(col("is_late"))
      .select("l_orderkey", "l_suppkey").distinct()
      .join(perOrder, col("l_orderkey") === col("ok"))
      .filter(col("n_supp") > 1 && col("n_late_supp") === 1)
      .groupBy(col("l_suppkey"))
      .agg(count(lit(1)).as("n_waiting_orders"))
      .join(broadcast(supplier.select("s_suppkey", "s_name")),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("n_waiting_orders"))
      .orderBy(col("n_waiting_orders").desc, col("s_suppkey"))
      .limit(20)
  }

  /** TPC-H Q17-shaped: revenue locked in small-quantity lines — lines
    * with qty below 20 % of their part's average. The correlated
    * average is rewritten division-free: qty < 0.2·(total/cnt) ⟺
    * 5·qty·cnt < total, so the threshold stays exact decimal in both
    * engines; only the final /7 display division is double (single
    * deterministic op on the exact sum).
    */
  def smallQuantityRevenue(lineitem: DataFrame): DataFrame = {
    val perPart = lineitem.groupBy(col("l_partkey").as("pk"))
      .agg(sum(money(col("l_quantity"))).as("total_qty"),
        count(lit(1)).as("cnt"))
    lineitem.join(perPart, col("l_partkey") === col("pk"))
      .filter(money(col("l_quantity")) * 5 * col("cnt") < col("total_qty"))
      .agg(count(lit(1)).as("n_lines"),
        (dbl(sum(money(col("l_extendedprice")))) / 7.0).as("avg_yearly"))
  }

  /** TPC-H Q8-shaped: one nation's share of a region's revenue per
    * order year. Shares divide two exact-decimal sums in double — a
    * single deterministic operation per row, no accumulation drift.
    */
  def marketShare(lineitem: DataFrame, orders: DataFrame, customer: DataFrame,
                  supplier: DataFrame, nation: DataFrame, region: DataFrame,
                  targetNation: String = "NATION_3"): DataFrame = {
    val net = (money(col("l_extendedprice")) * oneMinus(col("l_discount")))
      .cast(DecimalType(14, 4))
    lineitem
      .join(orders.select("o_orderkey", "o_custkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(customer.select("c_custkey", "c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation.select(col("n_nationkey").as("c_nk"),
        col("n_regionkey"))), col("c_nationkey") === col("c_nk"))
      .join(broadcast(region.filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .join(broadcast(supplier.select("s_suppkey", "s_nationkey")),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nation.select(col("n_nationkey").as("s_nk"),
        col("n_name").as("supp_nation"))), col("s_nationkey") === col("s_nk"))
      .select(year(to_date(col("o_orderdate"))).cast(LongType).as("o_year"),
        net.as("net_dec"), col("supp_nation"))
      .groupBy("o_year")
      .agg(dbl(sum(when(col("supp_nation") === targetNation, col("net_dec")))).as("nation_rev"),
        dbl(sum(col("net_dec"))).as("total_rev"))
      .select(col("o_year"),
        coalesce(col("nation_rev"), lit(0.0)).as("nation_rev"),
        col("total_rev"),
        (coalesce(col("nation_rev"), lit(0.0)) / col("total_rev")).as("mkt_share"))
      .orderBy("o_year")
  }

  /** TPC-H Q11-shaped: value concentration — parts whose shipped value
    * exceeds a fraction of the global total. The global scalar comes
    * from a broadcast 1-row aggregate (no window); the threshold test
    * is decimal-exact via multiplication.
    */
  def valueConcentration(lineitem: DataFrame, fraction: Double = 0.0005,
                         topN: Int = 100): DataFrame = {
    val perPart = lineitem.groupBy(col("l_partkey"))
      .agg(sum(money(col("l_extendedprice"))).as("value_dec"),
        count(lit(1)).as("n_lines"))
    val total = perPart.agg(sum(col("value_dec")).as("total_dec"))
    perPart.crossJoin(broadcast(total))
      // cast ladder keeps the product inside 38 digits in BOTH engines
      .filter(col("value_dec") >
        col("total_dec").cast(DecimalType(24, 2)) *
          lit(fraction).cast(DecimalType(12, 6)))
      .select(col("l_partkey"), dbl(col("value_dec")).as("part_value"),
        col("n_lines"))
      .orderBy(col("part_value").desc, col("l_partkey"))
      .limit(topN)
  }

  /** TPC-H Q16-shaped: how many distinct suppliers serve each
    * (brand, type, size) combination, counting only suppliers in good
    * standing (acctbal ≥ 0 — the reference excludes complaint
    * suppliers) and skipping the PROMO family. Supplier-part pairs come
    * from shipment history.
    */
  def supplierCountMatrix(lineitem: DataFrame, part: DataFrame,
                          supplier: DataFrame): DataFrame =
    lineitem.select("l_partkey", "l_suppkey").distinct()
      .join(broadcast(part.filter(col("p_type") =!= "PROMO")
        .select("p_partkey", "p_brand", "p_type", "p_size")),
        col("l_partkey") === col("p_partkey"))
      .join(broadcast(supplier.filter(col("s_acctbal") >= 0).select("s_suppkey")),
        col("l_suppkey") === col("s_suppkey"), "left_semi")
      .groupBy("p_brand", "p_type", "p_size")
      .agg(countDistinct(col("l_suppkey")).as("n_suppliers"))
      .orderBy(col("n_suppliers").desc, col("p_brand"), col("p_type"), col("p_size"))
      .limit(100)

  /** TPC-H Q2-shaped: cheapest eligible supplier per part. Supply cost
    * = min historical line price per (part, supplier); eligibility =
    * STANDARD small parts × EUROPE suppliers; winner = cost equal to
    * the per-part minimum (window min over p_partkey — key-partitioned,
    * never global). Part/supplier/geo sides all broadcast; the only
    * shuffle is the (part,supplier) cost aggregation.
    */
  def minCostSupplier(lineitem: DataFrame, part: DataFrame, supplier: DataFrame,
                      nation: DataFrame, region: DataFrame): DataFrame = {
    val costs = lineitem.groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(min(money(col("l_extendedprice"))).as("cost_dec"))
    val pp = part.filter(col("p_type") === "STANDARD" && col("p_size") <= 10)
      .select("p_partkey", "p_brand")
    val sup = supplier
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(region.filter(col("r_name") === "EUROPE")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("s_suppkey"), col("s_name"), col("s_acctbal"), col("n_name"))
    val w = Window.partitionBy("p_partkey")
    costs
      .join(broadcast(pp), col("l_partkey") === col("p_partkey"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .withColumn("min_cost", min(col("cost_dec")).over(w))
      .filter(col("cost_dec") === col("min_cost"))
      .select(col("s_acctbal"), col("s_name"), col("n_name"), col("p_partkey"),
        col("p_brand"), dbl(col("cost_dec")).as("supply_cost"))
      .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"), col("p_partkey"))
      .limit(100)
  }

  /** TPC-H Q9-shaped: profit by supplier nation × order year over a
    * part-name filter. Profit = net revenue − 10% holding cost of
    * retail×qty, all on exact decimals (both engines mirror the cast
    * ladder, so sums are bit-identical). Dims broadcast; lineitem⋈orders
    * is the one big shuffle.
    */
  def profitByNation(lineitem: DataFrame, orders: DataFrame, part: DataFrame,
                     supplier: DataFrame, nation: DataFrame): DataFrame = {
    val net = (money(col("l_extendedprice")) * oneMinus(col("l_discount")))
      .cast(DecimalType(14, 4))
    val cost = ((money(col("p_retailprice")) * money(col("l_quantity")))
      .cast(DecimalType(25, 4)) * rate(lit(0.1))).cast(DecimalType(21, 6))
    lineitem
      .join(broadcast(part.filter(col("p_name").like("red%"))
        .select("p_partkey", "p_retailprice")),
        col("l_partkey") === col("p_partkey"))
      .join(broadcast(supplier.select("s_suppkey", "s_nationkey")),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nation.select("n_nationkey", "n_name")),
        col("s_nationkey") === col("n_nationkey"))
      .join(orders.select("o_orderkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("n_name").as("nation"),
        year(to_date(col("o_orderdate"))).cast(LongType).as("o_year"),
        (net.cast(DecimalType(21, 6)) - cost).as("amount_dec"))
      .groupBy("nation", "o_year")
      .agg(dbl(sum(col("amount_dec"))).as("profit"))
      .orderBy(col("nation"), col("o_year").desc)
  }

  /** TPC-H Q15-shaped: the supplier(s) with maximum revenue in a
    * quarter. The scalar max comes from a broadcast 1-row aggregate
    * joined back on equality — no global window, no second scan of the
    * detail (the per-supplier aggregate is reused for both sides).
    */
  def topSupplierOfQuarter(lineitem: DataFrame, supplier: DataFrame,
                           qStart: String = "1996-01-01",
                           qEnd: String = "1996-04-01"): DataFrame = {
    val net = (money(col("l_extendedprice")) * oneMinus(col("l_discount")))
      .cast(DecimalType(14, 4))
    val rev = lineitem
      .filter(to_date(col("l_shipdate")) >= lit(qStart) &&
        to_date(col("l_shipdate")) < lit(qEnd))
      .groupBy(col("l_suppkey"))
      .agg(sum(net).as("rev_dec"))
    val mx = rev.agg(max(col("rev_dec")).as("mx_dec"))
    rev.join(broadcast(mx), col("rev_dec") === col("mx_dec"))
      .join(broadcast(supplier.select("s_suppkey", "s_name")),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), dbl(col("rev_dec")).as("total_revenue"))
      .orderBy("s_suppkey")
  }

  /** TPC-H Q20-shaped: suppliers holding an outsized share of a part
    * family's volume. Share test is decimal-exact (qty > 8% × part
    * total via multiplication — no division, no float drift); the part
    * total is a key-partitioned window sum. Output: qualifying ASIA
    * suppliers.
    */
  def excessShareSuppliers(lineitem: DataFrame, part: DataFrame,
                           supplier: DataFrame, nation: DataFrame,
                           region: DataFrame): DataFrame = {
    val qty = lineitem
      .join(broadcast(part.filter(col("p_name").like("small%")).select("p_partkey")),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(sum(money(col("l_quantity"))).as("qty_dec"))
    val w = Window.partitionBy("l_partkey")
    val flagged = qty
      .withColumn("tot_dec", sum(col("qty_dec")).over(w))
      .filter(col("qty_dec") > col("tot_dec") * rate(lit(0.08)))
      .select("l_suppkey").distinct()
    flagged
      .join(broadcast(supplier), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(region.filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("s_suppkey"), col("s_name"), col("n_name"))
      .orderBy("s_suppkey")
  }
}
