package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Dims, Facts, Validation}
import graft.sources.{Loader, Tables}

/** Whole-warehouse orchestrator — the Spark shape of the reference's
  * `main.py:94 run_full_etl` (extract → dimensions → facts → load →
  * final validation, with a per-stage run report; summary printer at
  * main.py:1016). Differences by design: stages are dependency-ordered
  * library calls over lazy DataFrames, "load" is partitioned parquet
  * landed per table (not row-batches through one DB cursor), and the
  * run report is itself a DataFrame so it can be stored/queried like
  * any other table. The reference's `_force_unlock_tables` phase has no
  * analogue: parquet overwrite-by-directory needs no lock janitor.
  *
  * Scale: each table build is one Spark job with the same plans the
  * registered queries use (broadcast dims, single-shuffle facts);
  * nothing here collects data to the driver — the report rows are
  * per-table metadata (row counts come from parquet footers after the
  * write, not an extra data scan).
  */
object Etl {

  final case class StageRow(stage: String, table: String, rows: Long,
                            seconds: Double, status: String)

  /** Build every dim + fact to `outDir`, run the validation suite, and
    * return the run report (stage, table, rows, seconds, status).
    * Tables land as parquet under `outDir/<table>`; the report itself
    * is also written to `outDir/etl_run_report`.
    */
  /** [[buildAll]] driven by a [[GraftConfig]] — the config-file
    * orchestration shape of the reference's main.py (etl_config.yaml
    * through config_manager): source and landing locations come from
    * the loaded config instead of call-site literals.
    */
  def buildAll(spark: SparkSession, config: GraftConfig): DataFrame =
    buildAll(spark, config.sfDir, config.outDir)

  def buildAll(spark: SparkSession, sfDir: String, outDir: String): DataFrame = {
    val report = scala.collection.mutable.ArrayBuffer[StageRow]()

    def run(stage: String, table: String)(build: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      try {
        Loader.truncateAndLoad(build, s"$outDir/$table")
        // footer-metadata count — no second pass over the data
        val n = spark.read.parquet(s"$outDir/$table").count()
        report += StageRow(stage, table, n, (System.nanoTime() - t0) / 1e9, "ok")
      } catch {
        case e: Exception =>
          report += StageRow(stage, table, -1L,
            (System.nanoTime() - t0) / 1e9, s"error: ${e.getMessage}")
      }
    }

    def t(name: String) = Tables(spark, sfDir, name)
    def out(name: String) = spark.read.parquet(s"$outDir/$name")

    // ---- phase 1: extraction (sources surfaced as-is; the reference
    // copies DB tables into staging frames — parquet sources already
    // are the staging layer, so this phase only verifies readability)
    Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "documents", "embeddings").foreach { name =>
      val t0 = System.nanoTime()
      try {
        val n = t(name).count()
        report += StageRow("extract", name, n, (System.nanoTime() - t0) / 1e9, "ok")
      } catch {
        case e: Exception =>
          report += StageRow("extract", name, -1L,
            (System.nanoTime() - t0) / 1e9, s"error: ${e.getMessage}")
      }
    }

    // ---- phase 2: dimensions (dependency-free; any order)
    run("dim", "dim_date") { Dims.dimDate(t("orders")) }
    run("dim", "dim_customer") { Dims.dimCustomer(t("customer"), t("nation"), t("region")) }
    run("dim", "dim_product") { Dims.dimProduct(t("part")) }
    run("dim", "dim_supplier") { Dims.dimSupplier(t("supplier"), t("nation"), t("region")) }
    run("dim", "dim_geography") { Dims.dimGeography(t("nation"), t("region")) }
    run("dim", "dim_order_status") { Dims.dimOrderStatus(t("orders")) }
    run("dim", "dim_brand") { Dims.dimBrand(t("part")) }
    run("dim", "dim_event_type") { Dims.dimEventType(Tables.events(spark, sfDir)) }
    run("dim", "dim_time_of_day") { Dims.dimTimeOfDay(Tables.events(spark, sfDir)) }
    run("dim", "dim_fiscal_period") { Dims.dimFiscalPeriod(t("orders")) }
    run("dim", "dim_payment_method") { Dims.dimPaymentMethod(spark) }
    run("dim", "dim_tax_rate") { Dims.dimTaxRate(t("lineitem")) }
    run("dim", "dim_promotion") { Dims.dimPromotion(t("part")) }
    run("dim", "dim_account") { Dims.dimAccount(spark) }
    run("dim", "dim_warehouse") { Dims.dimWarehouse(t("nation"), t("region")) }
    run("dim", "dim_shipping") { Dims.dimShipping(t("lineitem"), t("orders")) }
    run("dim", "dim_cost_center") { Dims.dimCostCenter(spark) }
    run("dim", "dim_transaction_type") { Dims.dimTransactionType(spark) }
    run("dim", "dim_movement_type") { Dims.dimMovementType(t("lineitem")) }
    run("dim", "dim_direccion") {
      Dims.dimDireccion(t("customer"), t("supplier"), t("nation"), t("region"))
    }
    run("dim", "dim_estado_pago") { Dims.dimEstadoPago(spark) }
    run("dim", "dim_categoria_producto") { Dims.dimProductCategory(t("part")) }
    run("dim", "dim_usuario") { Dims.dimUsuario(Tables.events(spark, sfDir)) }
    run("dim", "dim_sitio_web") { Dims.dimSitioWeb(spark) }
    // dim_orden / dim_line_item / dim_detalle_venta are degenerate dims:
    // pure views over the facts (Dims.dimOrden & co.) — materializing
    // them would duplicate fact-grain data, so the orchestrator skips
    // them by design (SURVEY §6).
    run("dim", "scd2_customer") { Dims.scd2Customer(t("orders")) }

    // ---- phase 3: facts (consume the dims just landed — the surrogate
    // resolution reads the warehouse's own dim tables, as a real star
    // build must)
    run("fact", "fact_sales") {
      Facts.factSales(t("lineitem"), t("orders"),
        out("dim_customer"), out("dim_product"), out("dim_supplier"),
        out("dim_order_status"))
    }
    run("fact", "fact_sales_promo") {
      Facts.factSalesPromo(t("lineitem"), t("part"), out("dim_promotion"))
    }
    run("fact", "fact_inventory") { Facts.factInventory(t("lineitem"), t("part"), t("supplier")) }
    run("fact", "fact_inventory_wh") {
      Facts.factInventoryWarehouse(t("lineitem"), t("supplier"), t("part"),
        out("dim_warehouse"))
    }
    run("fact", "fact_transactions") { Facts.factTransactions(Tables.events(spark, sfDir)) }
    run("fact", "fact_pnl") { Facts.factPnl(t("lineitem"), t("orders")) }
    run("fact", "fact_balance") { Facts.factBalance(t("orders")) }

    // ---- phase 4: final validation. Each check's findings column is
    // named per check (n_violations / n_orphans / n_dup_keys /
    // n_mismatched); a non-zero finding marks the stage "findings: N"
    // — data-quality signal, NOT a failed build — while exceptions
    // mark it "error: …".
    val findingCols = Seq("n_violations", "n_orphans", "n_dup_keys", "n_mismatched")
    def validate(table: String)(build: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      try {
        val df = build
        val present = df.columns.filter(findingCols.contains)
        // one aggregation pass yields both the row count and the
        // findings count — each check's plan evaluates exactly once
        val (rows, bad) =
          if (present.isEmpty) (df.count(), 0L)
          else {
            val r = df.agg(count(lit(1)).as("n"),
              count(when(present.map(c => col(c) > 0).reduce(_ || _), 1))
                .as("bad")).head
            (r.getLong(0), r.getLong(1))
          }
        report += StageRow("validate", table, rows,
          (System.nanoTime() - t0) / 1e9, if (bad == 0) "ok" else s"findings: $bad")
      } catch {
        case e: Exception =>
          report += StageRow("validate", table, -1L,
            (System.nanoTime() - t0) / 1e9, s"error: ${e.getMessage}")
      }
    }
    validate("validate_nulls") {
      Validation.nullProfile(spark,
        Seq("customer" -> t("customer"), "orders" -> t("orders")))
    }
    validate("validate_ranges") { Validation.rangeChecks(t("lineitem"), Tables.events(spark, sfDir)) }
    validate("validate_ri") {
      Validation.riChecks(t("lineitem"), t("orders"), t("customer"),
        t("part"), t("supplier"), t("nation"), t("region"))
    }
    validate("validate_duplicates") {
      Validation.duplicateProfile(t("documents"), Tables.events(spark, sfDir), t("lineitem"))
    }
    validate("reconcile_orders") { Validation.reconcileOrders(t("lineitem"), t("orders")) }

    import spark.implicits._
    val reportDf = report.toSeq.toDF()
      .select(col("stage"), col("table"), col("rows"), col("seconds"), col("status"))
    Loader.truncateAndLoad(reportDf, s"$outDir/etl_run_report")
    reportDf
  }

  /** CDC-driven incremental fact maintenance end-to-end: diff the
    * STANDING fact against the re-aggregated current snapshot at the
    * fact grain (Validation.snapshotDiff — real I/U/D change capture,
    * not a rebuild), and apply the change stream back to the standing
    * fact with Loader.applyChanges. Diffing the sink itself (rather
    * than a rebuild of what the sink is believed to contain) makes the
    * maintenance self-healing: any drift in the standing fact —
    * partial prior maintenance, manual patches — surfaces as a U and
    * is repaired. The maintained fact is row-identical to a full
    * rebuild from the new snapshot — asserted by EtlSpec AND by the
    * fact_transactions_cdc oracle, whose DuckDB side IS the full
    * rebuild (the reference's incremental-load semantics, ref
    * core/batch_processor.py checkpoint/resume, now driven by change
    * capture).
    *
    * Scale shape: one fact-grain aggregate of the new snapshot
    * (map-side partials over events, grain ≪ raw rows), one key join
    * against the standing fact for the diff, and the apply moves only
    * changed grains plus their replacement rows. Signature comparison
    * stays in one engine, so the double measure is cast-stable (see
    * snapshotDiff's parity note for the cross-engine caveat).
    */
  def maintainFactTransactions(currentFact: DataFrame,
                               newEvents: DataFrame): DataFrame = {
    val keys = Seq("user_id", "event_type", "event_date")
    val newFact = Facts.factTransactions(newEvents)
    // materialize the change stream once: applyChanges consumes it from
    // BOTH its anti-join (kept rows) and semi-join (replacements), and
    // a lazy plan would re-run the full diff — the aggregate shuffle +
    // the outer key join — per consumer (plan-audited). The stream is
    // the small side by construction (CDC's point); eager checkpoint
    // also hands AQE real size stats so the apply joins can go
    // broadcast. In production this is the landed CDC artifact anyway.
    // (fact_transactions_cdc is in SparkEntry.checkpointingQueries so
    // the harnesses GC the pinned blocks afterwards.)
    val changes = Validation.snapshotDiff(
      currentFact, newFact, keys, Seq("n_events", "total_value"))
      .localCheckpoint(true)
    Loader.applyChanges(currentFact, changes, newFact, keys)
      .orderBy("user_id", "event_type", "event_date")
  }

  /** One-row rollup of a run report — the Spark twin of the
    * reference's MetricsCollector.get_summary() (utils/metrics.py:50):
    * records processed/failed, stage counts, success rate, duration.
    * The reference's psutil memory/CPU telemetry maps to Spark's own
    * metrics system (executor metrics via SparkListener / the metrics
    * sink), deliberately not re-invented here.
    */
  def runSummary(report: DataFrame): DataFrame = {
    // "findings: N" from validation stages is data-quality signal, not
    // a stage failure — only "error: ..." statuses count as failed
    val failed = col("status").startsWith("error")
    report.agg(
      sum(when(col("status") === "ok", col("rows")).otherwise(0L))
        .as("records_processed"),
      sum(when(failed, 1L).otherwise(0L)).as("stages_failed"),
      count(lit(1)).as("stages_total"),
      (sum(when(!failed, 1L).otherwise(0L)) * lit(100.0) /
        count(lit(1))).as("success_rate_pct"),
      sum(col("seconds")).as("duration_seconds"))
  }

  /** Export every landed warehouse table as headered CSV (the
    * reference ships a driver-side Excel exporter —
    * exportar_dimensiones_excel.py; CSV is the scale-sane stand-in:
    * distributed writes, no single-process workbook). Returns a
    * (table, rows) report; row counts come from the parquet footers,
    * not a re-scan of the export.
    */
  def exportCsv(spark: SparkSession, warehouseDir: String,
                exportDir: String): DataFrame = {
    import spark.implicits._
    val tables = graft.sources.Fs.childDirs(spark, warehouseDir)
    val rows = tables.map { t =>
      val df = spark.read.parquet(s"$warehouseDir/$t")
      Tables.writeCsv(df, s"$exportDir/$t")
      (t, df.count())
    }
    rows.toDF("table", "rows")
  }
}
