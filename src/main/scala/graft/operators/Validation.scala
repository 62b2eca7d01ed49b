package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.ColUtil._
import org.apache.spark.sql.types.{DoubleType, LongType, StringType}

/** Data-quality suite — Spark-first re-expression of
  * core/data_validator.py. Each check is a declarative plan returning
  * violation rows/counts, so the whole suite runs as a handful of
  * scans with map-side aggregation (the reference iterates pandas rows).
  */
object Validation {

  /** Schema contract for a table (ref data_validator.py schema dicts). */
  case class ColumnContract(name: String,
                            dataType: org.apache.spark.sql.types.DataType,
                            required: Boolean = true,
                            default: Any = null)

  /** Structure/type report against a contract (ref :101
    * `_validate_structure` + :125 `_validate_data_types`): one row per
    * contract column with its status.
    */
  def schemaReport(spark: SparkSession, df: DataFrame,
                   contract: Seq[ColumnContract]): DataFrame = {
    import spark.implicits._
    val actual = df.schema.fields.map(f => f.name -> f.dataType).toMap
    contract.map { c =>
      actual.get(c.name) match {
        case None if c.required => (c.name, "missing", "", c.dataType.typeName)
        case None => (c.name, "absent_optional", "", c.dataType.typeName)
        case Some(t) if t == c.dataType => (c.name, "ok", t.typeName, c.dataType.typeName)
        case Some(t) => (c.name, "type_mismatch", t.typeName, c.dataType.typeName)
      }
    }.toDF("column_name", "status", "found_type", "expected_type")
  }

  /** Conform a frame to the contract: add missing required columns with
    * their defaults, cast mismatched types, project to contract order
    * (the reference mutates the pandas frame in place; here it's a pure
    * projection the optimizer can push around).
    */
  def conformSchema(df: DataFrame, contract: Seq[ColumnContract]): DataFrame = {
    val actual = df.schema.fieldNames.toSet
    val cols = contract.map { c =>
      if (!actual.contains(c.name)) lit(c.default).cast(c.dataType).as(c.name)
      else col(c.name).cast(c.dataType).as(c.name)
    }
    df.select(cols: _*)
  }

  /** Sentinel default marking a key column whose null values get a
    * generated id instead of a constant (ref data_validator.py:188).
    */
  val AutoId = "AUTO_ID"

  /** Row-level repair against the contract (ref data_validator.py:227
    * `_populate_missing_data` + :188 auto-ids): required columns
    * coalesce their nulls to the contract default; an [[AutoId]]
    * default fills null keys with `AUTO_<col>_<md5(row)>` — derived
    * from the row's full content, so it's distributed and reproducible
    * across runs/engines, unlike the reference's wall-clock-stamped
    * `_generate_auto_id`. Pure projection: composes with
    * [[conformSchema]] (run that first to materialize missing columns)
    * and stays a map-only stage at any scale.
    */
  def conformRows(df: DataFrame, contract: Seq[ColumnContract]): DataFrame = {
    // \u0001 column separator + \u0000 null marker: neither appears in cast
    // data, so distinct rows cannot collide (("ab","c") vs ("a","bc"); null
    // vs blank). Exact duplicate rows intentionally share a signature - the
    // id is a function of row content, not position.
    val rowSig = md5(concat_ws("\u0001",
      df.columns.map(c => coalesce(col(c).cast(StringType), lit("\u0000"))): _*))
    val cols = contract.map { c =>
      val base = col(c.name).cast(c.dataType)
      c.default match {
        case _ if !c.required || c.default == null => base.as(c.name)
        case AutoId => coalesce(base,
          concat(lit(s"AUTO_${c.name}_"), rowSig).cast(c.dataType)).as(c.name)
        case d => coalesce(base, lit(d).cast(c.dataType)).as(c.name)
      }
    }
    df.select(cols: _*)
  }

  /** Per-column null/blank profile (ref data_validator.py:166
    * `_validate_required_fields`). One aggregate pass per table; long
    * format (table, column, n_rows, n_null, n_blank).
    */
  def nullProfile(spark: SparkSession, tables: Seq[(String, DataFrame)]): DataFrame = {
    val frames = tables.map { case (tname, df) =>
      val aggs = df.schema.fields.flatMap { f =>
        val c = col(f.name)
        val isBlank = f.dataType.typeName match {
          case "string" => trim(c) === ""
          case _        => lit(false)
        }
        Seq(
          count(when(c.isNull, 1)).as(s"__null_${f.name}"),
          count(when(isBlank, 1)).as(s"__blank_${f.name}"))
      }
      val wide = df.agg(count(lit(1)).as("__rows"), aggs: _*)
      val stackArgs = df.schema.fields.map { f =>
        s"'${f.name}', __rows, `__null_${f.name}`, `__blank_${f.name}`"
      }.mkString(", ")
      wide.selectExpr(s"'$tname' as table_name",
        s"stack(${df.schema.fields.length}, $stackArgs) " +
          "as (column_name, n_rows, n_null, n_blank)")
    }
    frames.reduce(_ unionAll _).orderBy("table_name", "column_name")
  }

  /** Range-rule violations (ref :260 `_validate_ranges`). One scan,
    * conditional counts.
    */
  def rangeChecks(lineitem: DataFrame, events: DataFrame): DataFrame = {
    val li = lineitem.agg(
      count(when(col("l_quantity") <= 0, 1)).as("qty_not_positive"),
      count(when(col("l_discount") < 0 || col("l_discount") > 1, 1)).as("discount_out_of_range"),
      count(when(col("l_extendedprice") < 0, 1)).as("price_negative"),
      count(when(col("l_tax") < 0, 1)).as("tax_negative"),
      count(when(col("l_shipdate").isNull, 1)).as("shipdate_null"))
      .selectExpr("stack(5, " +
        "'lineitem.qty_not_positive', qty_not_positive, " +
        "'lineitem.discount_out_of_range', discount_out_of_range, " +
        "'lineitem.price_negative', price_negative, " +
        "'lineitem.tax_negative', tax_negative, " +
        "'lineitem.shipdate_null', shipdate_null) as (rule, n_violations)")
    val ev = events.agg(
      count(when(col("value").isNull, 1)).as("value_null"),
      count(when(col("ts").isNull, 1)).as("ts_null"))
      .selectExpr("stack(2, " +
        "'events.value_null', value_null, " +
        "'events.ts_null', ts_null) as (rule, n_violations)")
    li.unionAll(ev).orderBy("rule")
  }

  /** Referential-integrity orphan counts (ref :204
    * `_validate_referential_integrity`). Each check is a left-anti join;
    * the dim side of every check is broadcast.
    */
  def riChecks(lineitem: DataFrame, orders: DataFrame, customer: DataFrame,
               part: DataFrame, supplier: DataFrame, nation: DataFrame,
               region: DataFrame): DataFrame = {
    def orphans(name: String, child: DataFrame, childKey: String,
                parent: DataFrame, parentKey: String, bcast: Boolean): DataFrame = {
      val p = parent.select(col(parentKey))
      val rhs = if (bcast) broadcast(p) else p
      child.join(rhs, col(childKey) === col(parentKey), "left_anti")
        .agg(count(lit(1)).as("n_orphans"))
        .select(lit(name).as("check_name"), col("n_orphans"))
    }
    Seq(
      orphans("lineitem->orders", lineitem, "l_orderkey", orders, "o_orderkey", bcast = false),
      orphans("lineitem->part", lineitem, "l_partkey", part, "p_partkey", bcast = true),
      orphans("lineitem->supplier", lineitem, "l_suppkey", supplier, "s_suppkey", bcast = true),
      orphans("orders->customer", orders, "o_custkey", customer, "c_custkey", bcast = true),
      orphans("customer->nation", customer, "c_nationkey", nation, "n_nationkey", bcast = true),
      orphans("nation->region", nation, "n_regionkey", region, "r_regionkey", bcast = true)
    ).reduce(_ unionAll _).orderBy("check_name")
  }

  /** Duplicate-key profile (ref :299 `_remove_duplicates` keep-first):
    * summary per table/key of how many keys, how many duplicated keys,
    * and how many surplus rows a keep-first dedup would drop.
    */
  def duplicateProfile(documents: DataFrame, events: DataFrame,
                       lineitem: DataFrame): DataFrame = {
    def profile(tname: String, keyName: String, df: DataFrame, key: Column): DataFrame =
      df.groupBy(key.as("k")).agg(count(lit(1)).as("n"))
        .agg(count(lit(1)).as("n_keys"),
          count(when(col("n") > 1, 1)).as("n_dup_keys"),
          coalesce(sum(when(col("n") > 1, col("n") - 1)), lit(0)).as("n_surplus_rows"))
        .select(lit(tname).as("table_name"), lit(keyName).as("key_name"),
          col("n_keys"), col("n_dup_keys"), col("n_surplus_rows"))
    Seq(
      profile("documents", "norm_text_md5", documents,
        md5(lower(trim(col("text"))).cast("binary"))),
      profile("events", "user_type_ts", events,
        concat_ws("|", col("user_id"), col("event_type"), col("ts").cast("string"))),
      profile("lineitem", "order_line", lineitem,
        concat_ws("|", col("l_orderkey"), col("l_linenumber")))
    ).reduce(_ unionAll _).orderBy("table_name")
  }

  /** Fact↔source reconciliation (ref :339 `validate_symmetry` + :394
    * `merge_and_reconcile`): Σ line net+tax vs order header total, per
    * status; mismatch = |diff| > 1.00.
    */
  /** One-pass per-column table profile — the ANALYZE-style statistics
    * surface a warehouse load publishes (row count, null count, exact
    * distinct count, numeric min/max). ONE aggregate over the table:
    * the multi-column exact count-distinct compiles to a single
    * Expand + partial-aggregate shuffle (input fans out ×columns
    * map-side but crosses the exchange pre-aggregated); at extreme
    * scale flip `approx = true` to trade the Expand for one
    * HyperLogLog pass (approx_count_distinct, not oracle-checkable —
    * the exact form is the verified surface). min/max are reported
    * for numeric columns only (cast to double, exact — no string
    * rendering, whose formatting differs across engines).
    */
  def tableProfile(df: DataFrame, approx: Boolean = false): DataFrame = {
    import org.apache.spark.sql.types.{ByteType, ShortType, IntegerType, FloatType}
    val numeric: Set[org.apache.spark.sql.types.DataType] =
      Set(ByteType, ShortType, IntegerType, LongType, FloatType, DoubleType)
    val cols = df.schema.fields
    val aggs = cols.flatMap { f =>
      val c = col(f.name)
      val nd = if (approx) approx_count_distinct(c) else countDistinct(c)
      Seq(
        count(c).as(s"__nn_${f.name}"),
        nd.as(s"__nd_${f.name}")) ++
        (if (numeric.contains(f.dataType))
          Seq(min(c).cast(DoubleType).as(s"__mn_${f.name}"),
            max(c).cast(DoubleType).as(s"__mx_${f.name}"))
        else
          Seq(lit(null).cast(DoubleType).as(s"__mn_${f.name}"),
            lit(null).cast(DoubleType).as(s"__mx_${f.name}")))
    }
    val wide = df.agg(count(lit(1)).as("__n"), aggs: _*)
    // unpivot the single wide row into one row per column
    val stacked = cols.map { f =>
      struct(lit(f.name).as("column_name"), col("__n").as("n_rows"),
        (col("__n") - col(s"__nn_${f.name}")).as("n_nulls"),
        col(s"__nd_${f.name}").as("n_distinct"),
        col(s"__mn_${f.name}").as("min_num"),
        col(s"__mx_${f.name}").as("max_num"))
    }
    wide.select(explode(array(stacked: _*)).as("p"))
      .select("p.column_name", "p.n_rows", "p.n_nulls", "p.n_distinct",
        "p.min_num", "p.max_num")
      .orderBy("column_name")
  }

  /** Equi-width histogram of a numeric column — the distribution half
    * of the ANALYZE surface next to [[tableProfile]] (optimizer
    * statistics, skew diagnosis, partition sizing). Two metadata-scale
    * passes: a 1-row min/max aggregate broadcast onto the scan (the
    * repo's scalar crossJoin pattern), then one groupBy over at most
    * `nBuckets` keys with map-side partials. Bucket math sticks to one
    * operation order — width = (hi−lo)/N once, then (x−lo)/width —
    * so every double is IEEE-identical across engines and the floor
    * boundaries cannot flake; the top edge folds into the last bucket
    * (least(·, N−1)), and a constant column (hi = lo) degenerates to
    * one bucket instead of dividing by zero.
    */
  def columnHistogram(df: DataFrame, column: String,
                      nBuckets: Int = 20): DataFrame = {
    val bounds = df.agg(min(col(column)).cast(DoubleType).as("lo"),
      max(col(column)).cast(DoubleType).as("hi"))
    val width = (col("hi") - col("lo")) / lit(nBuckets.toDouble)
    df.select(col(column).cast(DoubleType).as("x"))
      .filter(col("x").isNotNull)
      .crossJoin(broadcast(bounds))
      .select(col("x"), col("lo"), col("hi"),
        when(col("hi") === col("lo"), lit(0L))
          .otherwise(least(floor((col("x") - col("lo")) / width),
            lit((nBuckets - 1).toDouble)).cast(LongType))
          .as("bucket"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_rows"),
        min(col("x")).as("min_val"), max(col("x")).as("max_val"),
        first(col("lo")).as("lo"), first(col("hi")).as("hi"))
      .select(col("bucket"),
        (col("lo") + col("bucket") * ((col("hi") - col("lo")) / lit(nBuckets.toDouble)))
          .as("bucket_lo"),
        (col("lo") + (col("bucket") + lit(1L)) * ((col("hi") - col("lo")) / lit(nBuckets.toDouble)))
          .as("bucket_hi"),
        col("n_rows"), col("min_val"), col("max_val"))
      .orderBy("bucket")
  }

  def reconcileOrders(lineitem: DataFrame, orders: DataFrame): DataFrame = {
    val lineTotals = lineitem.groupBy(col("l_orderkey")).agg(
      sum((money(col("l_extendedprice")) * oneMinus(col("l_discount")))
        .cast(org.apache.spark.sql.types.DecimalType(14, 4)))
        .as("line_net_dec"))
    orders
      .join(lineTotals, col("o_orderkey") === col("l_orderkey"), "left")
      .select(col("o_orderstatus"),
        (money(col("o_totalprice")) - coalesce(col("line_net_dec"),
          lit(0).cast(org.apache.spark.sql.types.DecimalType(14, 4)))).as("diff_dec"))
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n_orders"),
        count(when(abs(col("diff_dec")) > 1.0, 1)).as("n_mismatched"),
        dbl(sum(col("diff_dec"))).as("total_diff"))
      .orderBy("o_orderstatus")
  }

  /** Row-count drift between two snapshots of the same tables (the
    * post-load sanity check a scheduled warehouse runs against the
    * previous run): per table, both counts, delta, and pct change.
    * Footer-metadata counts when the inputs are parquet — no data scan.
    */
  def rowCountDrift(prev: Seq[(String, DataFrame)],
                    current: Seq[(String, DataFrame)]): DataFrame = {
    val prevMap = prev.toMap
    val rows = current.map { case (name, cur) =>
      val nCur = cur.count()
      val nPrev = prevMap.get(name).map(_.count()).getOrElse(0L)
      val pct = if (nPrev == 0) null
        else java.lang.Double.valueOf(100.0 * (nCur - nPrev) / nPrev)
      (name, nPrev, nCur, nCur - nPrev, pct)
    }
    val spark = current.head._2.sparkSession
    import spark.implicits._
    rows.toDF("table_name", "prev_rows", "current_rows", "delta", "pct_change")
      .orderBy("table_name")
  }

  /** Snapshot diff (CDC between two loads of the same table): one
    * full-outer join on the natural key classifies every key as
    * inserted (new only), deleted (old only) or updated (both sides
    * present, compare-signature differs); unchanged keys are dropped.
    * Signatures use an INJECTIVE self-delimiting field encoding —
    * null → `n`, value v → `v<charlen>:<v>` — so no value content
    * (separators, control characters, null look-alikes) can make two
    * distinct rows collide; the encoding is computed map-side, so the
    * only shuffle is the key join and the change stream — not the
    * snapshots — is what flows downstream. Key matching is null-SAFE:
    * a null-keyed row present in both snapshots compares as one row
    * (a null-unsafe join would emit a spurious D+I pair for it). This
    * is the diff a 100 TB warehouse feeds into incremental fact
    * maintenance instead of rebuilding; with both snapshots bucketed
    * on the key it runs exchange-free.
    *
    * compareCols parity constraint: signatures encode each field via
    * CAST(x AS STRING), whose text differs across engines for some
    * types (Spark renders a large double `1.0E7` where DuckDB writes
    * `10000000.0`; decimal/timestamp formatting varies similarly).
    * Integral and string columns are cast-stable — the registered
    * snapshot_diff query uses only those. Canonicalize
    * double/decimal/timestamp compare columns (e.g. to a fixed-scale
    * DECIMAL string or epoch long) before passing them here if
    * cross-engine signature parity matters.
    */
  def snapshotDiff(oldSnap: DataFrame, newSnap: DataFrame,
                   keys: Seq[String], compareCols: Seq[String]): DataFrame = {
    def enc(x: Column) = {
      val s = x.cast(StringType)
      coalesce(concat(lit("v"), length(s), lit(":"), s), lit("n"))
    }
    def sig(c: String) = md5(concat_ws("",
      compareCols.map(x => enc(col(x))): _*)).as(c)
    val o = oldSnap.select(keys.map(k => col(k).as(s"__o_$k")) :+ sig("old_sig"): _*)
    val n = newSnap.select(keys.map(k => col(k).as(s"__n_$k")) :+ sig("new_sig"): _*)
    val joinCond = keys.map(k => o(s"__o_$k") <=> n(s"__n_$k")).reduce(_ && _)
    o.join(n, joinCond, "full_outer")
      .withColumn("change_op",
        when(col("old_sig").isNull, "I")
          .when(col("new_sig").isNull, "D")
          .when(col("old_sig") =!= col("new_sig"), "U"))
      .filter(col("change_op").isNotNull)
      .select(keys.map(k => coalesce(col(s"__o_$k"), col(s"__n_$k")).as(k)) ++
        Seq(col("change_op"), col("old_sig"), col("new_sig")): _*)
      .orderBy(keys.head, keys.tail: _*)
  }

  /** Data-freshness check across the time-bearing tables: per table,
    * newest record date and its lag (days) behind the freshest table —
    * the staleness alarm an operational warehouse runs after each load
    * (the reference logs per-table extract timestamps; this makes the
    * check a queryable result). One tiny 1-row aggregate per table,
    * cross-joined to the global max — no data-size-dependent state.
    */
  def freshness(orders: DataFrame, lineitem: DataFrame,
                events: DataFrame): DataFrame = {
    val perTable = Seq(
      ("orders", orders.agg(max(to_date(col("o_orderdate"))).as("max_date"))),
      ("lineitem", lineitem.agg(max(to_date(col("l_shipdate"))).as("max_date"))),
      ("events", events.agg(max(to_date(col("ts"))).as("max_date"))))
      .map { case (name, df) => df.select(lit(name).as("table_name"), col("max_date")) }
      .reduce(_ unionByName _)
    val global = perTable.agg(max(col("max_date")).as("global_max"))
    perTable.crossJoin(broadcast(global))
      .select(col("table_name"), col("max_date"),
        datediff(col("global_max"), col("max_date")).cast(org.apache.spark.sql.types.LongType)
          .as("lag_days"))
      .withColumn("is_stale", col("lag_days") > 30)
      .orderBy("table_name")
  }

  /** Two-sample distribution drift between snapshots of a numeric
    * column — the distribution-shape companion to [[rowCountDrift]]'s
    * volume check (a silent upstream price-scaling bug keeps row
    * counts flat while shifting every histogram bin): both sides are
    * binned into `bins` equal-width buckets over the UNION's observed
    * [min, max], and each bin publishes its counts plus its
    * contribution to the two-sample χ² statistic in the
    * product-rewritten form (o₁·n₂ − o₂·n₁)²/(n₁·n₂·(o₁+o₂)) — no
    * square roots, every input an exact integer count, the double
    * arithmetic mirror-parenthesized and micro-quantized (the
    * benford discipline).
    *
    * Scale: two map-only scans union into one bounded-key (≤ bins)
    * map-side-combined aggregate; the min/max bounds and the n₁/n₂
    * totals are 1-row broadcasts. Nothing corpus-sized shuffles.
    */
  def distributionDrift(prev: DataFrame, cur: DataFrame,
                        column: String = "o_totalprice",
                        bins: Int = 20): DataFrame = {
    val u = prev.select(col(column).cast(DoubleType).as("x"), lit(0).as("side"))
      .unionByName(cur.select(col(column).cast(DoubleType).as("x"), lit(1).as("side")))
    val bounds = u.agg(min(col("x")).as("mn"), max(col("x")).as("mx"))
    val w = (col("mx") - col("mn")) / lit(bins.toDouble)
    val counts = u
      .crossJoin(broadcast(bounds)) // 1-row scalar
      .withColumn("bin",
        when(col("mx") === col("mn"), lit(0L))
          .otherwise(least(floor((col("x") - col("mn")) / w),
            lit((bins - 1).toLong))).cast(LongType))
      .groupBy("bin")
      .agg(count(when(col("side") === 0, 1)).as("n_prev"),
        count(when(col("side") === 1, 1)).as("n_cur"))
    val totals = counts.agg(sum(col("n_prev")).as("t_prev"),
      sum(col("n_cur")).as("t_cur"))
    val d = col("n_prev").cast(DoubleType) * col("t_cur").cast(DoubleType) -
      col("n_cur").cast(DoubleType) * col("t_prev").cast(DoubleType)
    counts
      .crossJoin(broadcast(totals)) // 1-row scalar
      // try_divide: an EMPTY snapshot side zeroes the denominator —
      // the contribution must be NULL (DuckDB's /0), not NaN/Inf
      // (Spark's raw double division) — the r7.4 degenerate-divide
      // contract; NULL propagates through the quantization unchanged
      .withColumn("chi2_micro",
        floor(try_divide(d * d,
          col("t_prev").cast(DoubleType) * col("t_cur").cast(DoubleType) *
            (col("n_prev").cast(DoubleType) + col("n_cur").cast(DoubleType))) *
          lit(1e6) + lit(0.5)).cast(LongType))
      .select("bin", "n_prev", "n_cur", "t_prev", "t_cur", "chi2_micro")
      .orderBy("bin")
  }

  /** Expected Benford leading-digit shares log10(1 + 1/d), computed
    * ONCE in Scala and inlined as literals into BOTH the DataFrame
    * plan and the generated oracle SQL — the shortest-round-trip
    * double repr parses to the identical bits in either engine, so no
    * cross-engine log10 call ever happens.
    */
  val benfordShares: Seq[(Int, Double)] =
    (1 to 9).map(d => d -> math.log10(1.0 + 1.0 / d))

  /** Benford's-law first-digit audit over order amounts — the classic
    * anomaly/fraud screen a finance warehouse runs (Nigrini 1996):
    * observed leading-digit counts against the log10(1+1/d) law, with
    * the per-digit χ² contribution (obs − n·p)²/(n·p). Synthetic
    * uniform prices will FAIL the law loudly — the operator reports
    * the divergence, it does not assert conformance.
    *
    * Determinism: the leading digit is taken from the INTEGER part's
    * string (amounts ≥ 1; double→string formatting differs across
    * engines, BIGINT→string does not); counts are exact longs; the
    * expected shares are compile-time literals (see [[benfordShares]]);
    * the χ² contribution is micro-quantized per digit AFTER fully
    * parenthesis-mirrored double arithmetic. Scale: one map-side
    * combined 9-key aggregate + a 1-row count broadcast — nothing
    * else crosses the shuffle.
    */
  def benfordTotalprice(orders: DataFrame): DataFrame = {
    // floor, not a double→long CAST: Spark's cast truncates where
    // DuckDB's rounds — 999.9 would land in different digits
    val digit = substring(floor(col("o_totalprice")).cast("string"), 1, 1)
      .cast(LongType)
    val counts = orders.select(digit.as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("n_obs"))
    val total = orders.agg(count(lit(1)).as("n_total"))
    val share = benfordShares.tail.foldLeft(
      when(col("digit") === 1, lit(benfordShares.head._2))) {
        case (acc, (d, p)) => acc.when(col("digit") === d, lit(p))
      }
    val diff = col("n_obs").cast(DoubleType) -
      col("n_total").cast(DoubleType) * col("expected_share")
    counts
      .crossJoin(broadcast(total)) // 1-row scalar
      .withColumn("expected_share", share)
      .withColumn("chi2_micro",
        floor(diff * diff / (col("n_total").cast(DoubleType) * col("expected_share")) *
          lit(1e6) + lit(0.5)).cast(LongType))
      .select("digit", "n_obs", "n_total", "expected_share", "chi2_micro")
      .orderBy("digit")
  }
}
