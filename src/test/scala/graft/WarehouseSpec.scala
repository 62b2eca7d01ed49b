package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators._
import graft.sources.Tables

/** Semantic invariants of the dimensional layer (beyond the DuckDB
  * oracle hash parity, which the driver + tools/crosscheck.py cover).
  */
class WarehouseSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("dim_date: unique keys, valid calendar attributes") {
    val d = Dims.dimDate(Tables.orders(spark, sf)).cache()
    assert(d.count() === d.select("date_key").distinct().count())
    assert(d.filter(col("iso_dow") < 1 || col("iso_dow") > 7).count() === 0)
    assert(d.filter(col("is_weekend") =!= (col("iso_dow") >= 6)).count() === 0)
    assert(d.filter(col("quarter") =!= ((col("month") + 2) / 3).cast("long")).count() === 0)
    d.unpersist()
  }

  test("dim_customer: one row per customer, surrogate keys unique") {
    val c = Dims.dimCustomer(Tables.customer(spark, sf),
      Tables.nation(spark, sf), Tables.region(spark, sf)).cache()
    assert(c.count() === Tables.customer(spark, sf).count())
    assert(c.select("customer_sk").distinct().count() === c.count())
    c.unpersist()
  }

  test("fact_sales: line-item grain preserved, measure identity holds") {
    val fs = Facts.factSales(
      Tables.lineitem(spark, sf), Tables.orders(spark, sf),
      Dims.dimCustomer(Tables.customer(spark, sf), Tables.nation(spark, sf), Tables.region(spark, sf)),
      Dims.dimProduct(Tables.part(spark, sf)),
      Dims.dimSupplier(Tables.supplier(spark, sf), Tables.nation(spark, sf), Tables.region(spark, sf)),
      Dims.dimOrderStatus(Tables.orders(spark, sf))).cache()
    assert(fs.count() === Tables.lineitem(spark, sf).count())
    // net + discount == gross (exact decimal upstream → tiny double eps)
    val broken = fs.filter(
      abs(col("net_amount") + col("discount_amount") - col("gross_amount")) > 1e-6)
    assert(broken.count() === 0)
    fs.unpersist()
  }

  test("fact_sales_promo: line grain preserved, promo only on discounted PROMO parts") {
    val li = Tables(spark, sf, "lineitem")
    val part = Tables(spark, sf, "part")
    val f = Facts.factSalesPromo(li, part, Dims.dimPromotion(part)).cache()
    assert(f.count() === li.count(), "left-join semantics: every line keeps one row")
    // a promotion implies a discount was applied (ref PASO 3 join shape)
    assert(f.filter(col("promo_id") =!= -1L && col("discount_amount") <= 0).count() === 0)
    // undiscounted lines always resolve to the default member
    assert(f.filter(col("promo_id") === -1L).select("promo_name")
      .distinct().collect().map(_.getString(0)).toSeq === Seq("NO_PROMOTION"))
    // every non-default key resolves against dim_promotion
    val dimIds = Dims.dimPromotion(part).select("promo_id")
      .collect().map(_.getLong(0)).toSet
    assert(f.select("promo_id").distinct().collect().map(_.getLong(0))
      .forall(dimIds.contains))
    f.unpersist()
  }

  test("fact_pnl: REVENUE - DISCOUNT sign convention") {
    val p = Facts.factPnl(Tables.lineitem(spark, sf), Tables.orders(spark, sf)).cache()
    assert(p.filter(col("account") === "DISCOUNT" && col("amount") > 0).count() === 0)
    assert(p.filter(col("account") === "REVENUE" && col("amount") < 0).count() === 0)
    p.unpersist()
  }

  test("scd2: exactly one current version per customer, versions contiguous") {
    val s = Dims.scd2Customer(Tables.orders(spark, sf)).cache()
    val perCust = s.groupBy("c_custkey")
      .agg(sum(when(col("is_current"), 1).otherwise(0)).as("n_current"),
        max("version_n").as("max_v"), count(lit(1)).as("n_v"))
    assert(perCust.filter(col("n_current") =!= 1).count() === 0)
    assert(perCust.filter(col("max_v") =!= col("n_v")).count() === 0)
    // valid_to of version n == valid_from of version n+1 → no overlap
    assert(s.filter(col("valid_to").isNotNull && col("valid_to") <= col("valid_from"))
      .count() === 0)
    s.unpersist()
  }

  test("fact_balance: opening + period = closing, balances monotone") {
    val b = Facts.factBalance(Tables.orders(spark, sf)).cache()
    assert(b.filter(
      abs(col("opening_balance") + col("period_spend") - col("closing_balance")) > 1e-6)
      .count() === 0)
    assert(b.filter(col("opening_balance") < 0).count() === 0)
    b.unpersist()
  }

  test("warehouse grain: one warehouse per nation; inventory in/out reconciles") {
    val wh = Dims.dimWarehouse(Tables.nation(spark, sf), Tables.region(spark, sf))
    assert(wh.count() === Tables.nation(spark, sf).count())
    assert(wh.select("warehouse_sk").distinct().count() === wh.count())
    val fact = Facts.factInventoryWarehouse(Tables.lineitem(spark, sf),
      Tables.supplier(spark, sf), Tables.part(spark, sf), wh).cache()
    // grain: product × warehouse unique
    assert(fact.groupBy("p_partkey", "warehouse_code").count()
      .filter(col("count") > 1).count() === 0)
    // signed identity: net = in − out wherever both flows exist
    val broken = fact.filter(col("qty_in").isNotNull && col("qty_out").isNotNull &&
      col("net_qty") =!= (col("qty_in") - col("qty_out")))
    assert(broken.count() === 0)
    // every movement lands in a warehouse that exists in the dim
    assert(fact.join(wh, Seq("warehouse_code"), "left_anti").count() === 0)
    fact.unpersist()
  }

  test("movement/shipping dims: full coverage of observed flags, sane lead times") {
    val li = Tables.lineitem(spark, sf)
    val mov = Dims.dimMovementType(li)
    val flags = li.select("l_returnflag").distinct().count()
    assert(mov.count() === flags)
    assert(mov.filter(col("movement_code") === "R").head.getLong(4) === -1L)
    val ship = Dims.dimShipping(li, Tables.orders(spark, sf))
    assert(ship.count() <= 7 * 2 && ship.count() > 0)
    // every line is profiled exactly once across the junk-dim cells
    assert(ship.agg(sum("n_lines")).head.getLong(0) === li.count())
    assert(ship.filter(col("avg_lead_days").isNull).count() === 0)
  }

  test("address/status/category dims: one site per entity, consistent hierarchy") {
    val cust = Tables.customer(spark, sf)
    val supp = Tables.supplier(spark, sf)
    val addr = Dims.dimDireccion(cust, supp,
      Tables.nation(spark, sf), Tables.region(spark, sf)).cache()
    // one address site per customer + supplier; surrogate unique
    assert(addr.count() === cust.count() + supp.count())
    assert(addr.select("address_sk").distinct().count() === addr.count())
    // full address embeds the street and the real geography
    val r0 = addr.head
    assert(r0.getAs[String]("full_address").startsWith(r0.getAs[String]("street")))
    assert(addr.filter(col("country").isNull || col("region").isNull).count() === 0)

    val pay = Dims.dimEstadoPago(spark)
    assert(pay.count() === 6)
    assert(pay.select("payment_status_code").distinct().count() === 6)

    val usr = Dims.dimUsuario(Tables.events(spark, sf)).cache()
    assert(usr.count() ===
      Tables.events(spark, sf).select("user_id").distinct().count())
    assert(usr.filter(col("created_at") > col("updated_at")).count() === 0,
      "first activity can never postdate last activity")
    usr.unpersist()
    assert(Dims.dimSitioWeb(spark).count() === 5)

    val cat = Dims.dimProductCategory(Tables.part(spark, sf)).cache()
    // every level-2 cell's parent exists as a level-1 family
    val fams = cat.filter(col("level") === 1).select(col("category_code").as("pc"))
    val orphans = cat.filter(col("level") === 2)
      .join(fams, col("parent_code") === col("pc"), "left_anti")
    assert(orphans.count() === 0, "level-2 categories must roll up to a family")
    // family part counts reconcile with their cells
    val famTotal = cat.filter(col("level") === 1).agg(sum("n_parts")).head.getLong(0)
    val cellTotal = cat.filter(col("level") === 2).agg(sum("n_parts")).head.getLong(0)
    assert(famTotal === cellTotal && famTotal === Tables.part(spark, sf).count())
    addr.unpersist(); cat.unpersist()
  }

  test("degenerate dims are thin views: per-line grain, no row loss") {
    val li = Tables.lineitem(spark, sf)
    val orders = Tables.orders(spark, sf)
    val ord = Dims.dimOrden(orders)
    assert(ord.count() === orders.count())
    assert(ord.select("orden_id").distinct().count() === orders.count())
    val lineDim = Dims.dimLineItem(li, Tables.part(spark, sf)).cache()
    assert(lineDim.count() === li.count())
    assert(lineDim.select("line_item_id").distinct().count() === li.count(),
      "composite encode must stay unique at line grain")
    // unit price reconstructs the extended price at line grain
    val bad = lineDim.filter(
      abs(col("unit_price") * col("quantity")) < lit(0.0)).count()
    assert(bad === 0)
    val det = Dims.dimDetalleVenta(li)
    assert(det.count() === li.count())
    assert(det.filter(col("descripcion").isNull).count() === 0)
    lineDim.unpersist()
  }

  test("Graft.registerViews: SQL-first use with custom function") {
    Graft.registerViews(spark, sf)
    assert(spark.sql("SELECT count(*) n FROM lineitem").head.getLong(0) > 0)
    val sim = spark.sql(
      """SELECT cosine_sim(a.embedding, b.embedding) AS s
        |FROM embeddings a JOIN embeddings b ON a.vec_id = 0 AND b.vec_id = 1
        |""".stripMargin).head.getDouble(0)
    assert(sim >= -1.0 && sim <= 1.0)
  }

  test("schema contract: report flags drift, conform repairs it") {
    import org.apache.spark.sql.types._
    import spark.implicits._
    val contract = Seq(
      Validation.ColumnContract("id", LongType),
      Validation.ColumnContract("name", StringType),
      Validation.ColumnContract("score", DoubleType, required = true, default = 0.0))
    // drifted frame: score missing, id arrives as string
    val drifted = Seq(("1", "a"), ("2", "b")).toDF("id", "name")
    val report = Validation.schemaReport(spark, drifted, contract)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(report("id") === "type_mismatch")
    assert(report("name") === "ok")
    assert(report("score") === "missing")
    val fixed = Validation.conformSchema(drifted, contract)
    assert(fixed.schema.map(f => f.name -> f.dataType) ===
      Seq("id" -> LongType, "name" -> StringType, "score" -> DoubleType))
    assert(fixed.orderBy("id").collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
      === Seq((1L, 0.0), (2L, 0.0)))
  }

  test("row repair: contract defaults coalesce nulls, AUTO_ID fills null keys") {
    import org.apache.spark.sql.types._
    import spark.implicits._
    val contract = Seq(
      Validation.ColumnContract("key", StringType, required = true,
        default = Validation.AutoId),
      Validation.ColumnContract("status", StringType, required = true,
        default = "UNKNOWN"),
      Validation.ColumnContract("note", StringType, required = false))
    val ns = null.asInstanceOf[String]
    val dirty = Seq(
      ("K1", "open", "a"), (ns, ns, "b"), (ns, "closed", ns))
      .toDF("key", "status", "note")
    val fixed = Validation.conformRows(dirty, contract).cache()
    // every required column repaired; optional nulls untouched
    assert(fixed.filter(col("key").isNull || col("status").isNull).count() === 0)
    assert(fixed.filter(col("note").isNull).count() === 1)
    val byNote = fixed.collect()
      .map(r => Option(r.getString(2)) -> (r.getString(0), r.getString(1))).toMap
    assert(byNote(Some("a")) === (("K1", "open")))
    assert(byNote(Some("b"))._1.startsWith("AUTO_key_") &&
      byNote(Some("b"))._2 === "UNKNOWN")
    assert(byNote(None)._1.startsWith("AUTO_key_") && byNote(None)._2 === "closed")
    // generated ids: distinct per distinct row, stable across runs
    assert(fixed.select("key").distinct().count() === 3)
    val again = Validation.conformRows(dirty, contract)
    assert(fixed.exceptAll(again).count() === 0)
    fixed.unpersist()
  }

  test("snapshot diff: planted insert/delete/update classified; unchanged dropped") {
    import spark.implicits._
    val oldSnap = Seq(
      (1L, "A", 10L), (2L, "B", 20L), (3L, "C", 30L)
    ).toDF("k", "status", "amount")
    val newSnap = Seq(
      (1L, "A", 10L),   // unchanged → dropped
      (2L, "X", 20L),   // updated
      (4L, "D", 40L)    // inserted; 3 deleted
    ).toDF("k", "status", "amount")
    val d = Validation.snapshotDiff(oldSnap, newSnap, Seq("k"), Seq("status", "amount"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(d === Map(2L -> "U", 3L -> "D", 4L -> "I"))
  }

  test("snapshot diff: null and concatenation-ambiguous values do not collide") {
    import spark.implicits._
    val oldSnap = Seq(
      (1L, Option("ab"), Option("c")),
      (2L, None: Option[String], Option(" ")),
      (3L, Option("a\u0001b"), Option("c")), // value CONTAINING a the old separator byte
      (4L, None: Option[String], Option("x"))
    ).toDF("k", "x", "y")
    val newSnap = Seq(
      (1L, Option("a"), Option("bc")),
      (2L, Option(" "), Option(" ")),
      (3L, Option("a"), Option("b\u0001c")),
      (4L, Option("n"), Option("x")) // null vs the literal letter n
    ).toDF("k", "x", "y")
    val d = Validation.snapshotDiff(oldSnap, newSnap, Seq("k"), Seq("x", "y"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // every pair differs for real — the injective encoding must see all four
    assert(d === Map(1L -> "U", 2L -> "U", 3L -> "U", 4L -> "U"))
  }

  test("snapshot diff: null keys match null-safely (one U, not a spurious D+I pair)") {
    import spark.implicits._
    val oldSnap = Seq((Option(1L), "A"), (None: Option[Long], "B")).toDF("k", "x")
    val newSnap = Seq((Option(1L), "A"), (None: Option[Long], "C")).toDF("k", "x")
    val d = Validation.snapshotDiff(oldSnap, newSnap, Seq("k"), Seq("x")).collect()
    assert(d.length === 1)
    assert(d.head.isNullAt(0) && d.head.getString(1) === "U")
  }

  test("validation: clean synthetic data yields zero violations/orphans") {
    val ri = Validation.riChecks(Tables.lineitem(spark, sf), Tables.orders(spark, sf),
      Tables.customer(spark, sf), Tables.part(spark, sf), Tables.supplier(spark, sf),
      Tables.nation(spark, sf), Tables.region(spark, sf))
    assert(ri.agg(sum("n_orphans")).head.getLong(0) === 0)
    val rc = Validation.rangeChecks(Tables.lineitem(spark, sf), Tables.events(spark, sf))
    assert(rc.agg(sum("n_violations")).head.getLong(0) === 0)
  }

  test("table profile: planted nulls/dups counted; approx mode keeps the shape") {
    val df = Seq[(java.lang.Long, String)]((1L, "a"), (2L, "a"), (null, "b"), (4L, null))
      .toDF("k", "v")
    val p = Validation.tableProfile(df).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(p("k").getLong(1) === 4 && p("k").getLong(2) === 1) // rows, nulls
    assert(p("k").getLong(3) === 3)                            // distinct non-null
    assert(p("k").getDouble(4) === 1.0 && p("k").getDouble(5) === 4.0)
    assert(p("v").getLong(2) === 1 && p("v").getLong(3) === 2)
    assert(p("v").isNullAt(4) && p("v").isNullAt(5))           // non-numeric: no min/max
    // approx mode: same schema/rows, HLL counts within its rsd on tiny input
    val a = Validation.tableProfile(df, approx = true).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(a("k") === 3 && a("v") === 2)
  }

  test("column histogram: planted uniform values bucket evenly; constant column degenerates") {
    val df = (0 until 100).map(i => Tuple1(i.toDouble)).toDF("v")
    val h = Validation.columnHistogram(df, "v", nBuckets = 20).collect()
    assert(h.length === 20)
    assert(h.forall(_.getLong(3) === 5), "uniform 0..99 → 5 per bucket")
    // max value folds into the last bucket, not a 21st
    assert(h.map(_.getLong(0)).toSeq === (0L until 20L))
    val const = Seq(Tuple1(7.0), Tuple1(7.0)).toDF("v")
    val hc = Validation.columnHistogram(const, "v").collect()
    assert(hc.length === 1 && hc.head.getLong(0) === 0 && hc.head.getLong(3) === 2)
  }

  test("quality gate: bottom quartile per language dropped, threshold ties kept") {
    // 8 docs, one language: distinct-token ratios 2/8, 3/8, ..., 8/8, 8/8.
    // floor(0.25*8)=2 → the two lowest-score docs are dropped.
    def doc(id: Long, distinct: Int): (Long, String, String, String, Long) = {
      val words = (0 until 8).map(i => s"w${math.min(i, distinct - 1)}")
      (id, words.mkString(" "), "en", "src", 1L)
    }
    val docs = (Seq(doc(1, 2), doc(2, 3), doc(3, 4), doc(4, 5),
      doc(5, 6), doc(6, 7), doc(7, 8), doc(8, 8)))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val g = TextOps.qualityGate(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("kept")).toMap
    assert(g === Map(1L -> false, 2L -> false, 3L -> true, 4L -> true,
      5L -> true, 6L -> true, 7L -> true, 8L -> true))
    // tie at the threshold: two docs share the threshold score — both
    // kept (the rule drops AT MOST the target fraction)
    val tied = Seq(doc(1, 2), doc(2, 4), doc(3, 4), doc(4, 8))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val t = TextOps.qualityGate(tied).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("kept")).toMap
    assert(t === Map(1L -> false, 2L -> true, 3L -> true, 4L -> true))
  }

  test("rfm: a fully-ordered planted panel scores 111..444; quartiles balance on the corpus") {
    import spark.implicits._
    val rows = (1 to 4).flatMap { c =>
      (1 to c).map(i => (c.toLong, s"1996-01-0$c", c * 100.0))
    }
    val orders = rows.toDF("o_custkey", "o_orderdate", "o_totalprice")
    val r = graft.operators.Analytics.rfmSegments(orders).collect()
      .map(x => x.getLong(0) -> x.getString(7)).toMap
    assert(r === Map(1L -> "111", 2L -> "222", 3L -> "333", 4L -> "444"))
    // corpus: every score in 1..4 and quartiles near-balanced (ntile
    // bucket sizes differ by at most 1)
    val full = graft.operators.Analytics
      .rfmSegments(Tables.orders(spark, sf)).collect()
    Seq(4, 5, 6).foreach { i =>
      val byScore = full.groupBy(_.getLong(i)).view.mapValues(_.length)
      assert(byScore.keySet === Set(1L, 2L, 3L, 4L))
      assert(byScore.values.max - byScore.values.min <= 1)
    }
  }

  test("basket pairs: planted co-occurrence counts, exact lift, dense ranks") {
    import spark.implicits._
    val li = Seq((1L, 10L), (1L, 20L), (1L, 30L), (2L, 10L), (2L, 20L),
      (3L, 10L), (3L, 20L), (4L, 30L), (1L, 10L)) // dup line collapses
      .toDF("l_orderkey", "l_partkey")
    val r = graft.operators.Analytics.basketPairs(li).collect()
    assert(r.map(_.getLong(0)).toSeq === (1L to r.length.toLong))
    val top = r.head
    assert((top.getLong(1), top.getLong(2), top.getLong(3)) === ((10L, 20L, 3L)))
    assert(top.getDouble(6) === (3L * 4L).toDouble / (3L * 3L).toDouble)
    val all = r.map(x => (x.getLong(1), x.getLong(2)) -> x.getLong(3)).toMap
    assert(all === Map((10L, 20L) -> 3L, (10L, 30L) -> 1L, (20L, 30L) -> 1L))
    r.foreach(x => assert(x.getLong(3) <= math.min(x.getLong(4), x.getLong(5))))
  }

  test("benford audit: planted digits count exactly; chi2 replicates driver-side") {
    import spark.implicits._
    val amounts = Seq(123.45, 150.0, 1999.99, 10.01, 987.0, 20.5)
    val orders = amounts.toDF("o_totalprice")
    val r = graft.operators.Validation.benfordTotalprice(orders).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2), x.getDouble(3),
        x.getLong(4)))).toMap
    assert(r.keySet === Set(1L, 2L, 9L))
    assert(r(1L)._1 === 4L && r(2L)._1 === 1L && r(9L)._1 === 1L)
    assert(r.values.map(_._1).sum === amounts.length.toLong)
    // replicate the chi2 arithmetic for digit 1 in the same JVM
    val p1 = graft.operators.Validation.benfordShares.head._2
    val diff = 4.0 - 6.0 * p1
    val expected = math.floor(diff * diff / (6.0 * p1) * 1e6 + 0.5).toLong
    assert(r(1L)._4 === expected)
    // corpus run: shares exhaustive, counts conserve
    val full = graft.operators.Validation
      .benfordTotalprice(Tables.orders(spark, sf)).collect()
    assert(full.map(_.getLong(1)).sum === full.head.getLong(2))
    full.foreach(x => assert(x.getLong(0) >= 1 && x.getLong(0) <= 9))
  }

  test("distribution drift: identical snapshots score zero; disjoint ranges separate cleanly") {
    import spark.implicits._
    val vals = (0 until 200).map(i => i.toDouble)
    val same = vals.toDF("o_totalprice")
    val zero = graft.operators.Validation.distributionDrift(same, same).collect()
    assert(zero.nonEmpty)
    // o1 = o2 and n1 = n2 ⇒ the χ² numerator is exactly 0 per bin
    zero.foreach(r => assert(r.getLong(5) === 0L))
    // planted shift: prev ∈ [0,100), cur ∈ [100,200) — no bin mixes
    val prev = (0 until 100).map(_.toDouble).toDF("o_totalprice")
    val cur = (100 until 200).map(_.toDouble).toDF("o_totalprice")
    val drift = graft.operators.Validation.distributionDrift(prev, cur).collect()
    drift.foreach { r =>
      val (bin, nPrev, nCur) = (r.getLong(0), r.getLong(1), r.getLong(2))
      if (bin < 10) assert(nCur === 0L, s"bin $bin leaked cur rows")
      else assert(nPrev === 0L, s"bin $bin leaked prev rows")
      assert(r.getLong(5) > 0L, "fully-separated bins must contribute drift")
    }
    assert(drift.map(_.getLong(1)).sum === 100L)
    assert(drift.map(_.getLong(2)).sum === 100L)
    // an EMPTY snapshot side: counts still report, the chi2
    // contribution is NULL (the DuckDB /0 contract), no throw
    val emptySide = graft.operators.Validation
      .distributionDrift(vals.toDF("o_totalprice"),
        Seq.empty[Double].toDF("o_totalprice")).collect()
    assert(emptySide.nonEmpty)
    emptySide.foreach { r =>
      assert(r.getLong(2) === 0L)
      assert(r.isNullAt(5), "zero-denominator chi2 must be NULL, not NaN/Inf")
    }
  }

  test("cohort retention: month-0 is the full cohort; retention bounded; sizes conserve") {
    val r = graft.operators.Analytics
      .cohortRetention(Tables.orders(spark, sf)).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      val (size, active, ret) = (row.getLong(2), row.getLong(3), row.getDouble(4))
      assert(active <= size, "active cannot exceed cohort size")
      assert(ret > 0.0 && ret <= 1.0)
      // month 0: every cohort member placed an order that month by
      // definition of the cohort
      if (row.getLong(1) == 0L) assert(active === size)
    }
    // cohort sizes: summing each cohort's month-0 row re-derives the
    // distinct customer count
    val totalCustomers = Tables.orders(spark, sf)
      .select("o_custkey").distinct().count()
    val month0Sum = r.filter(_.getLong(1) == 0L).map(_.getLong(3)).sum
    assert(month0Sum === totalCustomers)
  }
}
