package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}
import graft.functions.ColUtil._

/** Fact builders — Spark-first re-expression of
  * transformers/complete_fact_builder.py. The reference resolves
  * surrogate keys by pandas-merging each dim (`_resolve_surrogate_keys`
  * :75); here every dim join is an explicit broadcast so the fact-side
  * scan streams once with map-side hash joins — no shuffle of the big
  * table at any dim resolution, which is the property that survives a
  * 1000-executor 100 TB run.
  *
  * All measures are computed on DECIMAL (see ColUtil) → exact,
  * shuffle-order-independent results.
  */
object Facts {

  /** Line-item-grain sales fact (ref :198 `build_fact_ventas`:
    * order ⋈ line_item, one row per line item, qty/gross/discount/net
    * measures, dup-guarded). The only shuffle is lineitem⋈orders on
    * orderkey — both sides large; at scale this is the join to bucket
    * or co-partition by orderkey.
    */
  def factSales(lineitem: DataFrame, orders: DataFrame,
                dimCustomer: DataFrame, dimProduct: DataFrame,
                dimSupplier: DataFrame, dimOrderStatus: DataFrame): DataFrame = {
    val net = (money(col("l_extendedprice")) * oneMinus(col("l_discount")))
      .cast(DecimalType(14, 4))
    val joined = lineitem
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(dimCustomer.select("c_custkey", "customer_sk")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(dimProduct.select("p_partkey", "product_sk")),
        col("l_partkey") === col("p_partkey"))
      .join(broadcast(dimSupplier.select("s_suppkey", "supplier_sk")),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(dimOrderStatus),
        Seq("o_orderstatus", "o_orderpriority"))
    joined.select(
        col("l_orderkey"),
        col("l_linenumber"),
        dateKey(to_date(col("o_orderdate"))).as("date_key"),
        col("customer_sk"),
        col("product_sk"),
        col("supplier_sk"),
        col("status_sk"),
        col("l_quantity").as("quantity"),
        col("l_extendedprice").as("gross_amount"),
        dbl(money(col("l_extendedprice")) * rate(col("l_discount"))).as("discount_amount"),
        dbl(net).as("net_amount"),
        dbl(net * rate(col("l_tax"))).as("tax_amount"),
        dbl(net * onePlus(col("l_tax"))).as("total_amount"))
      .orderBy("l_orderkey", "l_linenumber")
  }

  /** Per-line promotion resolution on the sales fact (ref
    * complete_fact_builder.py:272 — PASO 3 of build_fact_ventas: one
    * promotion per line item, top discount wins, default "none"). In
    * this mapping a line's candidate promotion is its part's
    * brand-promo when the part is PROMO-typed AND the line carries a
    * discount — at most one candidate per line, so the reference's
    * DISTINCT ON top-1 collapses to a deterministic CASE. Both the
    * part attributes and dim_promotion resolve via broadcast
    * (dims ≪ fact); the fact streams once, no shuffle before the
    * output sort.
    */
  def factSalesPromo(lineitem: DataFrame, part: DataFrame,
                     dimPromotion: DataFrame): DataFrame = {
    val promoId = when(col("p_type") === "PROMO" && rate(col("l_discount")) > 0,
      regexp_extract(col("p_brand"), "[0-9]+", 0).cast(LongType)).otherwise(-1L)
    lineitem
      .join(broadcast(part.select("p_partkey", "p_type", "p_brand")),
        col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey"), col("l_linenumber"), promoId.as("promo_id"),
        dbl(money(col("l_extendedprice")) * rate(col("l_discount"))).as("discount_amount"))
      .join(broadcast(dimPromotion.select("promo_id", "promo_sk", "promo_name")),
        Seq("promo_id"))
      .select("l_orderkey", "l_linenumber", "promo_id", "promo_sk",
        "promo_name", "discount_amount")
      .orderBy("l_orderkey", "l_linenumber")
  }

  /** Stock-position fact per part × supplier from shipment history
    * (ref :558 `build_fact_inventario`). One shuffle: groupBy
    * (partkey, suppkey) with map-side partial aggregation.
    */
  def factInventory(lineitem: DataFrame, part: DataFrame, supplier: DataFrame): DataFrame = {
    val agg = lineitem.groupBy("l_partkey", "l_suppkey").agg(
      count(lit(1)).as("n_shipments"),
      dbl(sum(money(col("l_quantity")))).as("total_qty"),
      dbl(sum(money(col("l_extendedprice")))).as("total_value"),
      min(to_date(col("l_shipdate"))).as("first_ship"),
      max(to_date(col("l_shipdate"))).as("last_ship"))
    agg
      .join(broadcast(part.select("p_partkey", "p_name", "p_brand")),
        col("l_partkey") === col("p_partkey"))
      .join(broadcast(supplier.select("s_suppkey", "s_name")),
        col("l_suppkey") === col("s_suppkey"))
      .withColumn("avg_unit_price", col("total_value") / col("total_qty"))
      .select("p_partkey", "s_suppkey", "p_name", "p_brand", "s_name",
        "n_shipments", "total_qty", "total_value", "avg_unit_price",
        "first_ship", "last_ship")
      .orderBy("p_partkey", "s_suppkey")
  }

  /** Warehouse-grain inventory movement fact (ref :558
    * `build_fact_inventario`: movements at product × almacen grain with
    * signed quantities per movement type). Each shipment lands in its
    * supplier's nation warehouse ([[Dims.dimWarehouse]] — one per
    * nation); return-flagged lines are outbound, the rest inbound, the
    * same signing rule [[Dims.dimMovementType]] catalogs. One shuffle:
    * groupBy (partkey, warehouse) with map-side partials; warehouse +
    * supplier resolution are broadcast joins so lineitem streams once.
    */
  def factInventoryWarehouse(lineitem: DataFrame, supplier: DataFrame,
                             part: DataFrame, dimWarehouse: DataFrame): DataFrame = {
    val qt = money(col("l_quantity"))
    val net = (money(col("l_extendedprice")) * oneMinus(col("l_discount")))
      .cast(DecimalType(14, 4))
    val agg = lineitem
      .join(broadcast(supplier.select("s_suppkey", "s_nationkey")),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("l_partkey"), col("s_nationkey").as("warehouse_code"))
      .agg(
        count(lit(1)).as("n_movements"),
        dbl(sum(when(col("l_returnflag") =!= "R", qt))).as("qty_in"),
        dbl(sum(when(col("l_returnflag") === "R", qt))).as("qty_out"),
        dbl(sum(when(col("l_returnflag") === "R", -qt).otherwise(qt))).as("net_qty"),
        dbl(sum(when(col("l_returnflag") === "R", -net).otherwise(net))).as("net_value"),
        max(to_date(col("l_shipdate"))).as("last_movement"))
    agg
      .join(broadcast(dimWarehouse.select("warehouse_code", "warehouse_sk",
        "warehouse_name")), Seq("warehouse_code"))
      .join(broadcast(part.select("p_partkey", "p_name")),
        col("l_partkey") === col("p_partkey"))
      .select("p_partkey", "warehouse_code", "warehouse_sk", "warehouse_name",
        "p_name", "n_movements", "qty_in", "qty_out", "net_qty", "net_value",
        "last_movement")
      .orderBy("p_partkey", "warehouse_code")
  }

  /** Transaction fact from the event stream: user × type × day grain
    * (ref :648 `build_fact_transacciones`). `value` is cast to exact
    * DECIMAL(18,6) before summing — sums don't drift with task order.
    */
  def factTransactions(events: DataFrame): DataFrame =
    events
      .groupBy(col("user_id"), col("event_type"),
        to_date(col("ts")).as("event_date"))
      .agg(count(lit(1)).as("n_events"),
        dbl(sum(col("value").cast(DecimalType(18, 6)))).as("total_value"))
      .orderBy("user_id", "event_type", "event_date")

  /** Period-balance fact (ref :908 `build_fact_balance`): per customer ×
    * month — period activity plus opening/closing running balances.
    * Monthly grain keeps the window state tiny; cumulative sums on
    * DECIMAL stay exact.
    */
  def factBalance(orders: DataFrame): DataFrame = {
    val monthly = orders
      .groupBy(col("o_custkey"),
        trunc(to_date(col("o_orderdate")), "month").as("month"))
      .agg(count(lit(1)).as("n_orders"),
        sum(money(col("o_totalprice"))).as("spend_dec"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("o_custkey").orderBy("month")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    monthly
      .withColumn("closing_dec", sum(col("spend_dec")).over(w))
      .select(col("o_custkey").as("c_custkey"), col("month"), col("n_orders"),
        dbl(col("spend_dec")).as("period_spend"),
        dbl(col("closing_dec") - col("spend_dec")).as("opening_balance"),
        dbl(col("closing_dec")).as("closing_balance"))
      .orderBy("c_custkey", "month")
  }

  /** P&L-style classification fact (ref :1011 `build_fact_estado_resultados`
    * classifies rows into signed accounting buckets via per-row CASE;
    * :1113 `clasificar_y_calcular_monto`). Aggregate-then-stack: ONE
    * groupBy(fiscal_year) computes the three exact-decimal sums, then
    * the 3 account rows per year are stacked from ~7 aggregate rows —
    * the stack never multiplies the fact-grain row count. Decimal sums
    * are exact, so sum-then-negate ≡ negate-then-sum and the result is
    * bit-identical to the per-row-stacked formulation.
    */
  def factPnl(lineitem: DataFrame, orders: DataFrame): DataFrame = {
    val net = (money(col("l_extendedprice")) * oneMinus(col("l_discount")))
      .cast(DecimalType(14, 4))
    // Partial-aggregate per orderkey BEFORE the orders join: the join
    // then moves |orders| pre-summed rows instead of |lineitem| raw
    // lines (4× fewer here, more at TPC-H line fan-out) — measured
    // 17.4 s → ~2 s at 8× sf0.1, where orders outgrow the broadcast
    // threshold and the join becomes a sort-merge. Decimal addition is
    // associative, so the two-level sum is bit-identical to the
    // single-level formulation the oracle mirrors.
    val perOrder = lineitem
      .select(col("l_orderkey"),
        net.cast(DecimalType(19, 6)).as("net_dec"),
        (money(col("l_extendedprice")) * rate(col("l_discount")))
          .cast(DecimalType(19, 6)).as("disc_dec"),
        (net * rate(col("l_tax"))).cast(DecimalType(19, 6)).as("tax_dec"))
      .groupBy("l_orderkey")
      .agg(count(lit(1)).as("order_lines"),
        sum(col("net_dec")).as("net_o"),
        sum(col("disc_dec")).as("disc_o"),
        sum(col("tax_dec")).as("tax_o"))
    perOrder
      .join(orders.select("o_orderkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(year(to_date(col("o_orderdate"))).cast(LongType).as("fiscal_year"))
      .agg(sum(col("order_lines")).as("n_lines"),
        sum(col("net_o")).cast(DecimalType(29, 6)).as("rev_sum"),
        sum(col("disc_o")).cast(DecimalType(29, 6)).as("disc_sum"),
        sum(col("tax_o")).cast(DecimalType(29, 6)).as("tax_sum"))
      .selectExpr("fiscal_year", "n_lines",
        "stack(3, 'REVENUE', rev_sum, 'DISCOUNT', -disc_sum, 'TAX', tax_sum) " +
        "as (account, amount_dec)")
      .select(col("fiscal_year"), col("account"), col("n_lines"),
        dbl(col("amount_dec")).as("amount"))
      .orderBy("fiscal_year", "account")
  }
}
