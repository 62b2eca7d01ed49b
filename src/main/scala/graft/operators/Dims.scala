package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.ColUtil._

/** Dimension builders — Spark-first re-expression of
  * transformers/complete_dimension_builder.py (reference builds each dim
  * as a pandas frame from SQL extracts; here each is a declarative plan
  * over the star-schema parquet so Catalyst prunes/pushes down).
  *
  * Scale notes: every dim here is small relative to facts, so fact
  * builders broadcast them. Surrogate keys are md5-of-natural-key
  * (ColUtil.surrogate) — no global sequence / row_number bottleneck.
  */
object Dims {

  /** Calendar dim over the order-date span
    * (ref complete_dimension_builder.py:75 `build_dim_fecha`: yyyymmdd
    * key, year/month/day/quarter/iso week/dow, names, weekend flag).
    */
  def dimDate(orders: DataFrame): DataFrame = {
    val d = to_date(col("o_orderdate"))
    orders
      .select(d.as("date_value")).distinct()
      .select(
        dateKey(col("date_value")).as("date_key"),
        col("date_value"),
        year(col("date_value")).cast(LongType).as("year"),
        month(col("date_value")).cast(LongType).as("month"),
        dayofmonth(col("date_value")).cast(LongType).as("day"),
        quarter(col("date_value")).cast(LongType).as("quarter"),
        weekofyear(col("date_value")).cast(LongType).as("iso_week"),
        isoDow(col("date_value")).as("iso_dow"))
      .withColumn("day_name", dowName(col("iso_dow")))
      .withColumn("month_name", monthName(col("month")))
      .withColumn("is_weekend", col("iso_dow") >= 6)
      // fixed-date holiday set (ref dim_fecha carries holiday flags;
      // the observed list is config, the mechanism is the deliverable)
      .withColumn("is_holiday",
        (col("month") === 1 && col("day") === 1) ||
          (col("month") === 5 && col("day") === 1) ||
          (col("month") === 12 && col("day") === 25))
      .orderBy("date_key")
  }

  /** Continuous calendar over the full order-date span — one row per
    * DAY whether or not it saw activity (the reference's dim_fecha
    * generates the complete range; [[dimDate]] keeps only active dates
    * for the sparse use case). Same attribute set.
    */
  def dimDateFull(orders: DataFrame): DataFrame =
    orders
      .agg(min(to_date(col("o_orderdate"))).as("dmin"),
        max(to_date(col("o_orderdate"))).as("dmax"))
      .select(explode(sequence(col("dmin"), col("dmax"),
        expr("interval 1 day"))).as("date_value"))
      .select(
        dateKey(col("date_value")).as("date_key"),
        col("date_value"),
        year(col("date_value")).cast(LongType).as("year"),
        month(col("date_value")).cast(LongType).as("month"),
        dayofmonth(col("date_value")).cast(LongType).as("day"),
        quarter(col("date_value")).cast(LongType).as("quarter"),
        weekofyear(col("date_value")).cast(LongType).as("iso_week"),
        isoDow(col("date_value")).as("iso_dow"))
      .withColumn("day_name", dowName(col("iso_dow")))
      .withColumn("month_name", monthName(col("month")))
      .withColumn("is_weekend", col("iso_dow") >= 6)
      .withColumn("is_holiday",
        (col("month") === 1 && col("day") === 1) ||
          (col("month") === 5 && col("day") === 1) ||
          (col("month") === 12 && col("day") === 25))
      .orderBy("date_key")

  /** Customer dim ⋈ nation ⋈ region + balance tier
    * (ref :349 `build_dim_cliente`). Dims broadcast: tiny vs fact side.
    */
  def dimCustomer(customer: DataFrame, nation: DataFrame, region: DataFrame): DataFrame =
    customer
      .join(broadcast(nation), customer("c_nationkey") === nation("n_nationkey"))
      .join(broadcast(region), nation("n_regionkey") === region("r_regionkey"))
      .select(
        col("c_custkey"),
        surrogate("cust", col("c_custkey")).as("customer_sk"),
        col("c_name"),
        col("c_mktsegment"),
        col("c_acctbal"),
        when(col("c_acctbal") < 0, "NEGATIVE")
          .when(col("c_acctbal") < 5000, "STANDARD")
          .otherwise("PREMIUM").as("balance_tier"),
        col("n_name").as("nation"),
        col("r_name").as("region"))
      .orderBy("c_custkey")

  /** Product dim + type family + price band (ref :197 `build_dim_producto`). */
  def dimProduct(part: DataFrame): DataFrame =
    part.select(
        col("p_partkey"),
        surrogate("part", col("p_partkey")).as("product_sk"),
        col("p_name"),
        col("p_brand"),
        col("p_type"),
        element_at(split(col("p_type"), " "), 1).as("type_family"),
        col("p_size"),
        col("p_retailprice"),
        when(col("p_retailprice") < 500, "BUDGET")
          .when(col("p_retailprice") < 1000, "MID")
          .otherwise("PREMIUM").as("price_band"))
      .orderBy("p_partkey")

  /** Supplier dim ⋈ nation ⋈ region (ref :872 `build_dim_proveedor`). */
  def dimSupplier(supplier: DataFrame, nation: DataFrame, region: DataFrame): DataFrame =
    supplier
      .join(broadcast(nation), supplier("s_nationkey") === nation("n_nationkey"))
      .join(broadcast(region), nation("n_regionkey") === region("r_regionkey"))
      .select(
        col("s_suppkey"),
        surrogate("supp", col("s_suppkey")).as("supplier_sk"),
        col("s_name"),
        col("s_acctbal"),
        col("n_name").as("nation"),
        col("r_name").as("region"))
      .orderBy("s_suppkey")

  /** Conformed geography dim (ref :480 `build_dim_direccion` flattened). */
  def dimGeography(nation: DataFrame, region: DataFrame): DataFrame =
    nation
      .join(broadcast(region), nation("n_regionkey") === region("r_regionkey"))
      .select(
        col("n_nationkey"),
        surrogate("geo", col("n_nationkey")).as("geo_sk"),
        col("n_name").as("nation"),
        col("r_regionkey"),
        col("r_name").as("region"))
      .orderBy("n_nationkey")

  /** Junk dim: distinct status × priority with a stable dense surrogate
    * (ref :655/:673 `build_dim_estado_orden`/`_pago`). Cardinality is
    * tiny (|status|×|priority|) so a global row_number is fine here —
    * the only place we allow one.
    */
  def dimOrderStatus(orders: DataFrame): DataFrame = {
    val w = Window.orderBy("o_orderstatus", "o_orderpriority")
    orders.select("o_orderstatus", "o_orderpriority").distinct()
      .withColumn("status_sk", row_number().over(w).cast(LongType))
      .select("status_sk", "o_orderstatus", "o_orderpriority")
      .orderBy("status_sk")
  }

  /** Brand dim derived from the product master with price-profile
    * attributes (ref :945 `build_dim_categoria_producto` pattern:
    * dimension distilled from a wider master).
    */
  def dimBrand(part: DataFrame): DataFrame =
    part.groupBy("p_brand")
      .agg(count(lit(1)).as("n_parts"),
        (dbl(sum(money(col("p_retailprice")))) / count(lit(1))).as("avg_retail"),
        min(col("p_retailprice")).as("min_retail"),
        max(col("p_retailprice")).as("max_retail"))
      .select(col("p_brand"), surrogate("brand", col("p_brand")).as("brand_sk"),
        col("n_parts"), col("avg_retail"), col("min_retail"), col("max_retail"))
      .orderBy("p_brand")

  /** Event-type dim from the activity stream: volume, reach, lifetime,
    * and a category classification (ref :441 `build_dim_canal`).
    */
  def dimEventType(events: DataFrame): DataFrame =
    events.groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        min(to_date(col("ts"))).as("first_seen"),
        max(to_date(col("ts"))).as("last_seen"))
      .select(col("event_type"),
        surrogate("etype", col("event_type")).as("event_type_sk"),
        when(col("event_type") === "purchase", "conversion")
          .when(col("event_type").isin("click", "view"), "engagement")
          .when(col("event_type") === "signup", "acquisition")
          .otherwise("ops").as("category"),
        col("n_events"), col("n_users"), col("first_seen"), col("last_seen"))
      .orderBy("event_type")

  /** Hour-of-day dim from the activity stream with daypart
    * classification (the intraday sibling of dim_date; ref dim_fecha
    * pattern at finer grain).
    */
  def dimTimeOfDay(events: DataFrame): DataFrame =
    events
      .groupBy(hour(col("ts")).cast(LongType).as("hour_of_day"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("hour_of_day"),
        when(col("hour_of_day") <= 5, "night")
          .when(col("hour_of_day") <= 11, "morning")
          .when(col("hour_of_day") <= 17, "afternoon")
          .otherwise("evening").as("daypart"),
        col("hour_of_day").between(9, 17).as("is_business_hours"),
        col("n_events"))
      .orderBy("hour_of_day")

  /** Accounting-period dim: one row per yyyymm month over the order-date
    * span (ref complete_dimension_builder.py:1138
    * `build_dim_periodo_contable` generates a fixed 2020–2026 grid; here
    * the span is data-derived). A period is closed once it precedes the
    * month of the newest order. Tiny by construction (≈1 row/month) —
    * the 1-row span aggregate plus explode is deliberate.
    */
  def dimFiscalPeriod(orders: DataFrame): DataFrame =
    orders
      .agg(min(to_date(col("o_orderdate"))).as("dmin"),
        max(to_date(col("o_orderdate"))).as("dmax"))
      .select(explode(sequence(trunc(col("dmin"), "month"),
        trunc(col("dmax"), "month"), expr("interval 1 month"))).as("start_date"),
        col("dmax"))
      .select(
        (year(col("start_date")) * 100 + month(col("start_date")))
          .cast(LongType).as("period_id"),
        year(col("start_date")).cast(LongType).as("year"),
        month(col("start_date")).cast(LongType).as("month"),
        quarter(col("start_date")).cast(LongType).as("quarter"),
        date_format(col("start_date"), "yyyy-MM").as("period_name"),
        col("start_date"),
        last_day(col("start_date")).as("end_date"),
        (last_day(col("start_date")) < trunc(col("dmax"), "month")).as("is_closed"))
      .orderBy("period_id")

  /** Payment-method catalog dim (ref complete_dimension_builder.py:696
    * `build_dim_pago`: a static 10-method catalog with processor and
    * payment-type attributes). Static reference data is legitimate dim
    * content; the surrogate follows the same md5 discipline as every
    * other dim.
    */
  def dimPaymentMethod(spark: org.apache.spark.sql.SparkSession): DataFrame = {
    import spark.implicits._
    val catalog = Seq(
      (1L, "Cash", "Manual", "Immediate"),
      (2L, "Credit Card", "Visa/MC", "Immediate"),
      (3L, "Debit Card", "Visa/MC", "Immediate"),
      (4L, "Wire Transfer", "Bank", "Immediate"),
      (5L, "Check", "Bank", "Deferred"),
      (6L, "PayPal", "PayPal", "Immediate"),
      (7L, "Stripe", "Stripe", "Immediate"),
      (8L, "Bitcoin", "Blockchain", "Immediate"),
      (9L, "Net 30", "Internal", "Credit"),
      (10L, "Net 60", "Internal", "Credit"))
    catalog.toDF("pay_method_id", "method", "processor", "payment_type")
      .select(col("pay_method_id"),
        surrogate("pay", col("pay_method_id")).as("payment_sk"),
        col("method"), col("processor"), col("payment_type"))
      .orderBy("pay_method_id")
  }

  /** Tax-rate dim distilled from observed line tax rates (ref
    * complete_dimension_builder.py:745 `build_dim_impuestos` ships a
    * static 3-rate catalog; here the catalog is data-derived — every
    * distinct rate with usage counts and a classification).
    */
  def dimTaxRate(lineitem: DataFrame): DataFrame =
    lineitem
      .groupBy(rate(col("l_tax")).as("tax_rate_dec"))
      .agg(count(lit(1)).as("n_lines"))
      .select(
        (col("tax_rate_dec") * 100).cast(LongType).as("tax_rate_key"),
        surrogate("tax", (col("tax_rate_dec") * 100).cast(LongType)).as("tax_sk"),
        dbl(col("tax_rate_dec")).as("tax_rate"),
        when(col("tax_rate_dec") === 0, "EXEMPT")
          .when(col("tax_rate_dec") < 0.05, "REDUCED")
          .otherwise("STANDARD").as("tax_class"),
        col("n_lines"))
      .orderBy("tax_rate_key")

  /** Promotion dim from the PROMO part family plus the reference's
    * mandatory default row (ref :766 `build_dim_promocion` prepends a
    * "Sin Promoción" record so facts without a promotion still resolve
    * a surrogate). One promo row per brand carrying PROMO-typed parts.
    */
  def dimPromotion(part: DataFrame): DataFrame = {
    val promo = part.filter(col("p_type") === "PROMO")
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_parts"),
        sum(money(col("p_retailprice"))).as("price_dec"))
      .select(
        regexp_extract(col("p_brand"), "[0-9]+", 0).cast(LongType).as("promo_id"),
        concat(lit("PROMO "), col("p_brand")).as("promo_name"),
        lit(true).as("is_active"),
        col("n_parts"),
        (dbl(col("price_dec")) / col("n_parts")).as("avg_retail"))
    val default = promo.sparkSession.range(1).select(
      lit(-1L).as("promo_id"), lit("NO_PROMOTION").as("promo_name"),
      lit(true).as("is_active"), lit(0L).as("n_parts"),
      lit(null).cast("double").as("avg_retail"))
    default.unionByName(promo)
      .select(col("promo_id"), surrogate("promo", col("promo_id")).as("promo_sk"),
        col("promo_name"), col("is_active"), col("n_parts"), col("avg_retail"))
      .orderBy("promo_id")
  }

  /** Chart-of-accounts dim (ref :1013 `build_dim_cuenta_contable`:
    * code/name/type/category/level/parent/active). Static reference
    * data aligned with the fact_pnl account buckets so the P&L fact
    * resolves against it.
    */
  def dimAccount(spark: org.apache.spark.sql.SparkSession): DataFrame = {
    import spark.implicits._
    val rows = Seq(
      ("4000", "Operating Income", "revenue", "P&L", 1L, "", true),
      ("4100", "REVENUE", "revenue", "P&L", 2L, "4000", true),
      ("4200", "DISCOUNT", "contra-revenue", "P&L", 2L, "4000", true),
      ("2000", "Current Liabilities", "liability", "BALANCE", 1L, "", true),
      ("2100", "TAX", "liability", "BALANCE", 2L, "2000", true),
      ("9999", "Suspense", "other", "NONE", 1L, "", false))
    rows.toDF("account_code", "account_name", "account_type",
        "category", "level", "parent_code", "is_active")
      .select(col("account_code"),
        surrogate("acct", col("account_code")).as("account_sk"),
        col("account_name"), col("account_type"), col("category"),
        col("level"), col("parent_code"), col("is_active"))
      .orderBy("account_code")
  }

  /** Warehouse dim (ref complete_dimension_builder.py:819
    * `build_dim_almacen`: codigo/nombre/ciudad/pais/capacidad/tipo/
    * activo from a warehouse CSV). The testdata has no warehouse
    * entity, so warehouses are derived deterministically from supplier
    * geography — one per nation, typed and capacity-profiled as pure
    * functions of the nation key. Broadcast-sized by construction.
    */
  def dimWarehouse(nation: DataFrame, region: DataFrame): DataFrame =
    nation
      .join(broadcast(region), nation("n_regionkey") === region("r_regionkey"))
      .select(
        col("n_nationkey").as("warehouse_code"),
        surrogate("wh", col("n_nationkey")).as("warehouse_sk"),
        concat(lit("WAREHOUSE "), col("n_name")).as("warehouse_name"),
        col("n_name").as("country"),
        col("r_name").as("region"),
        (lit(10000) + (col("n_nationkey") * 37 % 20) * 500)
          .cast(LongType).as("capacity_m3"),
        when(col("n_nationkey") % 3 === 0, "central")
          .when(col("n_nationkey") % 3 === 1, "regional")
          .otherwise("transit").as("warehouse_type"),
        lit(true).as("is_active"))
      .orderBy("warehouse_code")

  /** Shipping junk dim (ref :623 `build_dim_envio`: method/carrier/
    * estimated-days). The testdata lineitem carries no shipmode, so
    * the mode is a deterministic pure function of the line's natural
    * key (multimodal_meta precedent for synthetic attributes); the
    * second junk attribute is the real l_linestatus and the lead-time
    * profile is the real shipdate − orderdate. Tiny cardinality
    * (7 modes × |status|) so the dense row_number surrogate is fine,
    * like dimOrderStatus.
    */
  def dimShipping(lineitem: DataFrame, orders: DataFrame): DataFrame = {
    val modes = array(Seq("AIR", "FOB", "MAIL", "RAIL", "REG AIR", "SHIP", "TRUCK")
      .map(lit): _*)
    // multiplier 11 is coprime to 7, so the mode genuinely mixes both
    // parts of the line's natural key (a *7 term would vanish mod 7)
    val mode = element_at(modes,
      ((col("l_orderkey") * 11 + col("l_linenumber")) % 7 + 1).cast("int"))
    val w = Window.orderBy("ship_mode", "line_status")
    lineitem
      .join(orders.select("o_orderkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .select(mode.as("ship_mode"), col("l_linestatus").as("line_status"),
        datediff(to_date(col("l_shipdate")), to_date(col("o_orderdate")))
          .cast(LongType).as("lead_days"))
      .groupBy("ship_mode", "line_status")
      .agg(count(lit(1)).as("n_lines"), sum(col("lead_days")).as("lead_sum"))
      .withColumn("ship_sk", row_number().over(w).cast(LongType))
      .select(col("ship_sk"), col("ship_mode"), col("line_status"),
        when(col("ship_mode").isin("AIR", "REG AIR"), "AeroFreight")
          .when(col("ship_mode") === "SHIP", "OceanLine")
          .when(col("ship_mode") === "RAIL", "RailCo")
          .when(col("ship_mode") === "TRUCK", "RoadRunner")
          .when(col("ship_mode") === "MAIL", "PostalService")
          .when(col("ship_mode") === "FOB", "FreightOnBoard")
          .otherwise("GenericCarrier").as("carrier"),
        col("n_lines"),
        (col("lead_sum").cast("double") / col("n_lines")).as("avg_lead_days"))
      .orderBy("ship_sk")
  }

  /** Cost-center dim (ref :1066 `build_dim_centro_costo`:
    * codigo/nombre/descripcion/tipo/responsable/activo). Static
    * organizational reference data, dimAccount pattern.
    */
  def dimCostCenter(spark: org.apache.spark.sql.SparkSession): DataFrame = {
    import spark.implicits._
    val rows = Seq(
      ("CC100", "Sales", "Revenue generation", "revenue", "Sales Director", true),
      ("CC200", "Operations", "Order fulfillment", "operational", "COO", true),
      ("CC300", "Finance", "General and administrative", "support", "CFO", true),
      ("CC400", "IT", "Technology platform", "support", "CTO", true),
      ("CC500", "Logistics", "Distribution network", "operational", "Logistics Manager", true),
      ("CC900", "Legacy", "Closed cost center", "other", "", false))
    rows.toDF("cost_center_code", "cost_center_name", "description",
        "center_type", "manager", "is_active")
      .select(col("cost_center_code"),
        surrogate("cc", col("cost_center_code")).as("cost_center_sk"),
        col("cost_center_name"), col("description"), col("center_type"),
        col("manager"), col("is_active"))
      .orderBy("cost_center_code")
  }

  /** Transaction-type dim (ref :1102 `build_dim_tipo_transaccion`).
    * afecta_flujo (cash-flow direction) is DERIVED from the category,
    * mirroring the reference's lambda: ingreso/entrada → positivo,
    * gasto/egreso → negativo, else neutro.
    */
  def dimTransactionType(spark: org.apache.spark.sql.SparkSession): DataFrame = {
    import spark.implicits._
    val rows = Seq(
      ("TT01", "Sale", "Customer sale", "ingreso"),
      ("TT02", "Refund", "Customer refund", "egreso"),
      ("TT03", "Purchase", "Supplier purchase", "gasto"),
      ("TT04", "Transfer", "Internal transfer", "transferencia"),
      ("TT05", "Adjustment", "Inventory adjustment", "ajuste"),
      ("TT06", "Interest", "Interest income", "ingreso"))
    rows.toDF("txn_type_code", "txn_type_name", "description", "category")
      .select(col("txn_type_code"),
        surrogate("tt", col("txn_type_code")).as("txn_type_sk"),
        col("txn_type_name"), col("description"), col("category"),
        when(col("category").isin("ingreso", "entrada"), "positivo")
          .when(col("category").isin("gasto", "egreso"), "negativo")
          .otherwise("neutro").as("cash_flow_effect"),
        lit(true).as("is_active"))
      .orderBy("txn_type_code")
  }

  /** Movement-type dim (ref :917 `build_dim_tipo_movimiento`:
    * codigo/nombre/tipo/afecta_stock/activo). Data-derived from the
    * observed return flags — the same signing rule
    * [[Facts.factInventoryWarehouse]] applies, so the inventory fact
    * resolves against it (dimTaxRate pattern: catalog distilled from
    * data with usage counts).
    */
  def dimMovementType(lineitem: DataFrame): DataFrame =
    lineitem
      .groupBy(col("l_returnflag").as("movement_code"))
      .agg(count(lit(1)).as("n_lines"))
      .select(col("movement_code"),
        surrogate("mov", col("movement_code")).as("movement_sk"),
        when(col("movement_code") === "R", "Returned Shipment")
          .when(col("movement_code") === "A", "Accepted Shipment")
          .otherwise("Normal Shipment").as("movement_name"),
        when(col("movement_code") === "R", "outbound")
          .otherwise("inbound").as("direction"),
        when(col("movement_code") === "R", -1L).otherwise(1L).as("stock_effect"),
        lit(true).as("is_active"),
        col("n_lines"))
      .orderBy("movement_code")

  /** Address dim (ref complete_dimension_builder.py:441
    * `build_dim_direccion`: distinct street/city/postal/region/country
    * plus a concatenated full address from order addresses). The
    * testdata carries no address fields, so each customer/supplier
    * entity gets one deterministic synthetic site — street/city/postal
    * are pure functions of the entity key and its real geography
    * ([[dimWarehouse]] precedent). Geography joins are broadcast; the
    * union is map-only, so the build is one scan of each entity table.
    */
  def dimDireccion(customer: DataFrame, supplier: DataFrame,
                   nation: DataFrame, region: DataFrame): DataFrame = {
    val geo = nation
      .join(broadcast(region), nation("n_regionkey") === region("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"), col("r_name"))
    val sites = customer
      .select(lit("customer").as("entity_type"),
        col("c_custkey").cast(LongType).as("entity_key"),
        col("c_nationkey").as("nationkey"))
      .unionByName(supplier.select(lit("supplier").as("entity_type"),
        col("s_suppkey").cast(LongType).as("entity_key"),
        col("s_nationkey").as("nationkey")))
    sites
      .join(broadcast(geo), col("nationkey") === col("n_nationkey"))
      .select(
        surrogate("addr", concat(col("entity_type"), lit(":"), col("entity_key")))
          .as("address_sk"),
        col("entity_type"), col("entity_key"),
        concat((lit(100) + (col("entity_key") * 13) % 9900).cast(StringType),
          lit(" "), col("n_name"), lit(" ST")).as("street"),
        concat(col("n_name"), lit(" CITY "),
          (col("entity_key") % 10).cast(StringType)).as("city"),
        lpad(((col("entity_key") * 7919) % 100000).cast(StringType), 5, "0")
          .as("postal_code"),
        col("r_name").as("region"),
        col("n_name").as("country"),
        lit(true).as("is_active"))
      .withColumn("full_address",
        concat_ws(", ", col("street"), col("city"), col("region"), col("country")))
      .orderBy("entity_type", "entity_key")
  }

  /** Payment-status junk dim (ref :673 `build_dim_estado_pago`:
    * codigo/nombre/descripcion/activo from a status CSV, deduped by
    * code). Static reference data, [[dimAccount]] pattern;
    * [[dimPaymentMethod]] covers the payment METHOD axis — this is the
    * status axis of the same junk-dimension pair.
    */
  def dimEstadoPago(spark: org.apache.spark.sql.SparkSession): DataFrame = {
    import spark.implicits._
    val rows = Seq(
      ("PAG", "Pagado", "Pago completado en su totalidad", true),
      ("PEN", "Pendiente", "Pago aun no recibido", true),
      ("PAR", "Pago Parcial", "Abono recibido, saldo pendiente", true),
      ("REE", "Reembolsado", "Pago devuelto al cliente", true),
      ("FAL", "Fallido", "Intento de pago rechazado", true),
      ("CAN", "Cancelado", "Pago anulado antes de procesar", false))
    rows.toDF("payment_status_code", "status_name", "description", "is_active")
      .select(col("payment_status_code"),
        surrogate("pay_status", col("payment_status_code")).as("payment_status_sk"),
        col("status_name"), col("description"), col("is_active"))
      .orderBy("payment_status_code")
  }

  /** Product-category dim with hierarchy (ref :945
    * `build_dim_categoria_producto`: codigo/nombre/descripcion/
    * categoria_padre_id/nivel — a static two-level category tree). Here
    * the tree is distilled from the catalog itself ([[dimBrand]]
    * pattern): level 1 = the p_type family (parent null), level 2 =
    * type x brand assortment cells rolling up to their family. Two
    * small aggregations over part, union, tiny output — fact builders
    * broadcast it.
    */
  def dimProductCategory(part: DataFrame): DataFrame = {
    val families = part.groupBy(col("p_type"))
      .agg(count(lit(1)).as("n_parts"))
      .select(concat(lit("FAM:"), col("p_type")).as("category_code"),
        col("p_type").as("category_name"),
        lit(null).cast(StringType).as("parent_code"),
        lit(1L).as("level"), col("n_parts"))
    val cells = part.groupBy(col("p_type"), col("p_brand"))
      .agg(count(lit(1)).as("n_parts"))
      .select(
        concat(lit("TYP:"), col("p_type"), lit("/"), col("p_brand"))
          .as("category_code"),
        concat(col("p_type"), lit(" "), col("p_brand")).as("category_name"),
        concat(lit("FAM:"), col("p_type")).as("parent_code"),
        lit(2L).as("level"), col("n_parts"))
    families.unionByName(cells)
      .select(col("category_code"),
        surrogate("cat", col("category_code")).as("category_sk"),
        col("category_name"), col("parent_code"), col("level"), col("n_parts"))
      .orderBy("level", "category_code")
  }

  /** Degenerate order dim (ref :504 `build_dim_orden`: the order-number
    * lookup — id, 'ORD-' number, type/channel/currency constants,
    * created_at). The attributes are degenerate (they live at fact
    * grain already), so this is a THIN VIEW over orders — a pure
    * projection Catalyst collapses into the scan — not a materialized
    * copy. orden_id is the natural o_orderkey, as the reference keeps
    * the OroCommerce id.
    */
  def dimOrden(orders: DataFrame): DataFrame =
    orders.select(
      col("o_orderkey").as("orden_id"),
      col("o_orderkey").as("orden_externo_id"),
      concat(lit("ORD-"), col("o_orderkey")).as("numero_orden"),
      lit("Venta").as("tipo_orden"),
      lit("E-Commerce").as("canal"),
      lit("USD").as("moneda"),
      lit(1.0).as("tasa_cambio"),
      to_date(col("o_orderdate")).as("created_at"))
    .orderBy("orden_id")

  /** Deterministic per-line id at duplicate granularity: the testdata
    * generator emits duplicate (orderkey, linenumber) pairs, so the
    * composite encode alone is not unique — an occurrence index over
    * the full row ordering disambiguates. One shuffle on the composite
    * key, then partition-local numbering (per-key fan-out is tiny, so
    * this holds at any scale; no global sequence).
    */
  private def lineOccurrence: Column = {
    val w = Window.partitionBy("l_orderkey", "l_linenumber")
      .orderBy("l_partkey", "l_suppkey", "l_quantity", "l_extendedprice",
        "l_discount", "l_tax", "l_returnflag", "l_linestatus", "l_shipdate")
    ((col("l_orderkey") * 10 + col("l_linenumber")) * 100 +
      row_number().over(w)).cast(LongType)
  }

  /** Degenerate line-item dim (ref :543 `build_dim_line_item`: surrogate
    * id, product name, quantity, unit price per order line). Thin view
    * over lineitem with a broadcast part lookup for the product name.
    * The id is a composite encode of the natural key plus an occurrence
    * index ([[lineOccurrence]]) — deterministic and distributed, where
    * the reference assigns a driver-side sequential range. Unit price is
    * IEEE double division (bit-stable across engines), not a rounded
    * decimal.
    */
  def dimLineItem(lineitem: DataFrame, part: DataFrame): DataFrame =
    lineitem
      .withColumn("line_item_id", lineOccurrence)
      .join(broadcast(part.select(col("p_partkey"), col("p_name"))),
        col("l_partkey") === col("p_partkey"))
      .select(
        col("line_item_id"),
        col("l_orderkey").as("orderkey"),
        col("l_linenumber").cast(LongType).as("linenumber"),
        col("p_name").as("product_name"),
        dbl(col("l_quantity")).as("quantity"),
        (dbl(col("l_extendedprice")) / dbl(col("l_quantity"))).as("unit_price"))
      .orderBy("line_item_id")

  /** Degenerate sale-detail dim (ref :584 `build_dim_detalle_venta`:
    * surrogate id, product code, derived description). Thin view over
    * lineitem; the description derives from the line's return/status
    * flags (the testdata carries no free-text comment or ship method).
    */
  def dimDetalleVenta(lineitem: DataFrame): DataFrame =
    lineitem
      .withColumn("detalle_id", lineOccurrence)
      .select(
        col("detalle_id"),
        concat(lit("SKU-"), col("l_partkey")).as("codigo"),
        when(col("l_returnflag") === "R", "Devolucion registrada")
          .when(col("l_linestatus") === "F", "Venta estandar (finalizada)")
          .otherwise("Venta estandar (abierta)").as("descripcion"))
      .orderBy("detalle_id")

  /** User dim (ref :146 `build_dim_usuario`: id, username, email,
    * display name, active flag, created/updated timestamps from
    * oro_user). The testdata's user population lives in the events
    * stream, so the dim derives from it: one row per observed user,
    * created_at/updated_at = first/last activity day, identity fields
    * as deterministic functions of the id (the reference itself
    * synthesizes fallbacks: `usuario_<id>`, a placeholder email). One
    * groupBy on user_id — uniform key, map-side partials.
    */
  def dimUsuario(events: DataFrame): DataFrame =
    events
      .groupBy(col("user_id").as("usuario_id"))
      .agg(min(to_date(col("ts"))).as("created_at"),
        max(to_date(col("ts"))).as("updated_at"),
        count(lit(1)).as("n_events"))
      .select(col("usuario_id"),
        col("usuario_id").as("usuario_externo_id"),
        concat(lit("usuario_"), col("usuario_id")).as("username"),
        concat(lit("user"), col("usuario_id"), lit("@example.com")).as("email"),
        concat(lit("Usuario "), col("usuario_id")).as("nombre_completo"),
        lit(true).as("activo"),
        col("created_at"), col("updated_at"), col("n_events"))
      .orderBy("usuario_id")

  /** Website dim (ref :405 `build_dim_sitio_web`: id/name/url/active
    * from a sites CSV; oro_website is empty in the reference). Static
    * reference data, [[dimPaymentMethod]] pattern. The reference stamps
    * created_at = wall-clock now — here a fixed catalog date keeps the
    * dim deterministic across runs/engines.
    */
  def dimSitioWeb(spark: org.apache.spark.sql.SparkSession): DataFrame = {
    import spark.implicits._
    val catalogDate = java.sql.Date.valueOf("2024-01-01")
    val rows = Seq(
      (1L, "Tienda Online", "https://shop.example.com", "b2c", true),
      (2L, "Portal Mayorista", "https://b2b.example.com", "b2b", true),
      (3L, "Outlet", "https://outlet.example.com", "b2c", true),
      (4L, "Marketplace", "https://market.example.com", "marketplace", true),
      (5L, "Sitio Legado", "https://legacy.example.com", "b2c", false))
    rows.toDF("sitio_externo_id", "nombre", "url", "tipo", "activo")
      .select(col("sitio_externo_id"),
        surrogate("web", col("sitio_externo_id")).as("sitio_sk"),
        col("nombre"), col("url"), col("tipo"), col("activo"),
        lit(catalogDate).as("created_at"),
        lit(catalogDate).as("updated_at"))
      .orderBy("sitio_externo_id")
  }

  /** SCD Type-2 customer activity versions from order history: each
    * active day opens a version; valid_to = next version's start
    * (generalizes the reference loader's overwrite-upsert into proper
    * SCD2 — loaders/database_loader.py keeps only current state).
    * Windows partition by customer → shuffles once on c_custkey,
    * then all versioning is partition-local.
    */
  def scd2Customer(orders: DataFrame): DataFrame = {
    val daily = orders
      .groupBy(col("o_custkey"), to_date(col("o_orderdate")).as("valid_from"))
      .agg(count(lit(1)).as("orders_in_version"),
           sum(money(col("o_totalprice"))).as("spend_dec"))
    val w = Window.partitionBy("o_custkey").orderBy("valid_from")
    daily
      .withColumn("version_n", row_number().over(w).cast(LongType))
      .withColumn("valid_to", lead(col("valid_from"), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
      .withColumn("cum_orders", sum(col("orders_in_version"))
        .over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("cum_spend", dbl(sum(col("spend_dec"))
        .over(w.rowsBetween(Window.unboundedPreceding, 0))))
      .select(col("o_custkey").as("c_custkey"), col("version_n"),
        col("valid_from"), col("valid_to"), col("is_current"),
        col("orders_in_version"), col("cum_orders"), col("cum_spend"))
      .orderBy("c_custkey", "version_n")
  }
}
