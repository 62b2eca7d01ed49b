package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.functions.ColUtil._

/** Event-stream operators (batch side). The reference treats CRM
  * activity as another extract (fact_transacciones); here the event
  * table also exercises the operators a stream warehouse needs:
  * as-of join, sessionization, funnel, latest-record dedup, JSON
  * attribute extraction, tumbling windows. Streaming twins live in
  * graft.streaming.
  */
object EventOps {

  /** As-of join: for each purchase event, the latest order of that user
    * at-or-before the event timestamp.
    *
    * Implementation is the union-merge pattern, not a per-row lookup:
    * tag both streams, union, single shuffle on user_id, sort by
    * (time, tag) within partition, then `last(_, ignoreNulls)` carries
    * the most recent order attributes forward onto each event row.
    * O(n log n) per partition, no broadcast of the big side — this is
    * the shape that holds at 100 TB (a broadcast-hash or nested-loop
    * as-of would not).
    *
    * Orders are first deduped to one row per (user, date) keeping the
    * max orderkey so the as-of winner is well-defined.
    */
  def asofJoinEventsOrders(events: DataFrame, orders: DataFrame): DataFrame = {
    val ord = ordersPerCustDate(orders)
      .select(col("o_custkey").as("user_id"), col("o_orderdate").as("t"),
        lit(0).as("tag"), lit(null).cast("long").as("event_id"),
        col("o_orderkey"), to_date(col("o_orderdate")).as("order_date"),
        col("o_totalprice"))
    val ev = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("t"), lit(1).as("tag"),
        col("event_id"), lit(null).cast("long").as("o_orderkey"),
        lit(null).cast("date").as("order_date"),
        lit(null).cast("double").as("o_totalprice"))
    val w = Window.partitionBy("user_id")
      .orderBy(col("t"), col("tag"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    ord.unionAll(ev)
      .withColumn("last_orderkey", last(col("o_orderkey"), ignoreNulls = true).over(w))
      .withColumn("last_order_date", last(col("order_date"), ignoreNulls = true).over(w))
      .withColumn("last_totalprice", last(col("o_totalprice"), ignoreNulls = true).over(w))
      .filter(col("tag") === 1)
      .select(col("event_id"), col("user_id"), to_date(col("t")).as("event_date"),
        col("last_orderkey").as("o_orderkey"),
        col("last_order_date").as("order_date"),
        col("last_totalprice").as("o_totalprice"))
      .orderBy("event_id")
  }

  /** Orders deduped to one row per (customer, date) keeping the max
    * orderkey — the unique-(key,time) contract both as-of
    * implementations require.
    */
  def ordersPerCustDate(orders: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"), col("o_orderdate"))
      .orderBy(col("o_orderkey").desc)
    orders.withColumn("rn", row_number().over(w)).filter(col("rn") === 1).drop("rn")
  }

  /** Same as-of semantics as asofJoinEventsOrders, but through the
    * custom whole-operator plan (graft.plans.AsOfJoinPlan →
    * AsOfJoinExec): co-partitioned sort + single streaming merge per
    * partition instead of union + window.
    */
  def asofJoinCustom(spark: org.apache.spark.sql.SparkSession,
                     events: DataFrame, orders: DataFrame): DataFrame = {
    val ev = events.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val ord = ordersPerCustDate(orders)
      .select(col("o_custkey"), col("o_orderdate"), col("o_orderkey"), col("o_totalprice"))
    graft.plans.AsOf.join(spark, ev, ord,
        "user_id", "o_custkey", "ts", "o_orderdate")
      .select(col("event_id"), col("user_id"), to_date(col("ts")).as("event_date"),
        col("o_orderkey"), to_date(col("o_orderdate")).as("order_date"),
        col("o_totalprice"))
      .orderBy("event_id")
  }

  /** Point-in-time (temporal range) join: each purchase event matched
    * to the SCD2 customer version whose [valid_from, valid_to) interval
    * covers the event date — the "which version was true when this
    * happened" join every dimensional warehouse needs. Equality on the
    * key + range predicate → sort-merge join on user_id with a
    * partition-local interval filter; no broadcast needed, scales with
    * both sides.
    */
  def pointInTimeJoin(events: DataFrame, scd2: DataFrame): DataFrame = {
    val ev = events.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), to_date(col("ts")).as("event_date"))
    ev.join(scd2,
        col("user_id") === col("c_custkey") &&
          col("event_date") >= col("valid_from") &&
          (col("valid_to").isNull || col("event_date") < col("valid_to")))
      .select(col("event_id"), col("user_id"), col("event_date"),
        col("version_n"), col("valid_from"), col("cum_orders"), col("cum_spend"))
      .orderBy("event_id")
  }

  /** Gap-based sessionization (30-min inactivity closes a session):
    * lag → new-session flag → running count = session number. One
    * shuffle on user_id; everything else partition-local.
    */
  def sessionize(events: DataFrame): DataFrame = {
    val wOrd = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val flagged = events
      .withColumn("prev_ts", lag(col("ts"), 1).over(wOrd))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts")) > 1800, 1)
          .otherwise(0))
      .withColumn("session_n",
        sum(col("new_session")).over(wOrd.rowsBetween(Window.unboundedPreceding, 0)))
    flagged.groupBy("user_id", "session_n")
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("event_type")).as("n_event_types"),
        (unix_timestamp(max(col("ts"))) - unix_timestamp(min(col("ts"))))
          .as("duration_sec"),
        dbl(sum(col("value").cast(DecimalType(18, 6)))).as("total_value"))
      .orderBy("user_id", "session_n")
  }

  /** Sessionization through Spark's NATIVE session-window operator
    * (`session_window(ts, gap)` → SessionWindowing/MergingSessions
    * physical aggregation) — the same semantics [[sessionize]] derives
    * with lag+cumsum, but as a first-class Catalyst construct that also
    * drops into Structured Streaming unchanged. Session end = last
    * event + gap; an event exactly `gap` after its predecessor starts a
    * NEW session (windows are half-open — the oracle mirrors this with
    * `ts >= prev + gap`, at full µs precision rather than whole
    * seconds).
    */
  def sessionWindows(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .groupBy(col("user_id"), session_window(col("ts"), gap).as("sw"))
      .agg(count(lit(1)).as("n_events"),
        dbl(sum(col("value").cast(DecimalType(18, 6)))).as("total_value"))
      .select(col("user_id"), col("sw.start").as("session_start"),
        col("sw.end").as("session_end"), col("n_events"), col("total_value"))
      .orderBy("user_id", "session_start")

  /** Ordered funnel signup → view → click → purchase: each stage's
    * timestamp must be ≥ the previous stage's. Per-user conditional-min
    * aggregation chained through joins; output is one row per stage with
    * the surviving user count.
    */
  def funnel(events: DataFrame): DataFrame = {
    val s1 = events.filter(col("event_type") === "signup")
      .groupBy("user_id").agg(min(col("ts")).as("t1"))
    val s2 = events.filter(col("event_type") === "view")
      .join(s1, Seq("user_id")).filter(col("ts") >= col("t1"))
      .groupBy("user_id").agg(min(col("ts")).as("t2"))
    val s3 = events.filter(col("event_type") === "click")
      .join(s2, Seq("user_id")).filter(col("ts") >= col("t2"))
      .groupBy("user_id").agg(min(col("ts")).as("t3"))
    val s4 = events.filter(col("event_type") === "purchase")
      .join(s3, Seq("user_id")).filter(col("ts") >= col("t3"))
      .groupBy("user_id").agg(min(col("ts")).as("t4"))
    def stage(n: Int, name: String, df: DataFrame) =
      df.agg(count(lit(1)).as("n_users"))
        .select(lit(n).as("stage_n"), lit(name).as("stage"), col("n_users"))
    stage(1, "signup", s1).unionAll(stage(2, "view_after_signup", s2))
      .unionAll(stage(3, "click_after_view", s3))
      .unionAll(stage(4, "purchase_after_click", s4))
      .orderBy("stage_n")
  }

  /** Latest-record-per-key dedup (ref data_validator.py:299 keep-first,
    * generalized to keep-latest-by-timestamp): one row per
    * (user, event_type) keeping max ts, tie-broken by event_id.
    */
  def dedupLatest(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id", "event_type")
      .orderBy(col("ts").desc, col("event_id").desc)
    events.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("user_id"), col("event_type"), col("event_id"),
        to_date(col("ts")).as("last_date"),
        dbl(col("value").cast(DecimalType(18, 6))).as("value"))
      .orderBy("user_id", "event_type")
  }

  /** JSON attribute extraction from the props payload + aggregation
    * (schema-on-read semi-structured column, codegen'd get_json_object).
    */
  def jsonKv(events: DataFrame): DataFrame =
    events
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        count(col("k")).as("n_with_k"),
        sum(col("k")).as("sum_k"),
        (dbl(sum(col("k"))) / count(col("k"))).as("avg_k"))
      .orderBy("event_type")

  /** Cohort retention matrix: users bucketed by first-activity month,
    * counted per months-since-cohort. Month offsets via integer
    * year·12+month arithmetic (months_between returns fractional
    * doubles — not engine-portable). Two shuffles: per-user min, then
    * the cohort×offset rollup.
    */
  def cohortRetention(events: DataFrame): DataFrame = {
    // weekly cohorts: the event history spans ~a month, so a monthly
    // grain collapses the matrix to a single cell — ISO weeks give a
    // real cohort × offset triangle at every scale factor
    val aw = trunc(to_date(col("ts")), "week")
    val activity = events.select(col("user_id"), aw.as("activity_week")).distinct()
    val cohorts = activity.groupBy("user_id")
      .agg(min(col("activity_week")).as("cohort_week"))
    activity.join(cohorts, Seq("user_id"))
      .select(col("cohort_week"),
        (datediff(col("activity_week"), col("cohort_week")) / 7)
          .cast("long").as("week_n"))
      .groupBy("cohort_week", "week_n")
      .agg(count(lit(1)).as("n_active_users"))
      .orderBy("cohort_week", "week_n")
  }

  /** Event-type transition matrix: counts of consecutive
    * (type → next type) pairs per user timeline — the first-order
    * Markov view behavioral models start from. One shuffle on user_id;
    * the lead window is partition-local.
    */
  def typeTransitions(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    events.select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("next_type").as("to_type"))
      .agg(count(lit(1)).as("n_transitions"))
      .orderBy("from_type", "to_type")
  }

  /** DAU / trailing-7-day WAU per active day. Exact windowed distinct
    * users can't ride a plain window function; the trailing set is an
    * interval join of the (tiny, broadcast) day grid against distinct
    * user-days — ≤7× multiplicity, keyed shuffle on day.
    */
  def dauWau(events: DataFrame): DataFrame = {
    val ud = events.select(to_date(col("ts")).as("day"), col("user_id")).distinct()
    val days = ud.select(col("day").as("d")).distinct()
    val dau = ud.groupBy("day").agg(countDistinct(col("user_id")).as("dau"))
    val wau = broadcast(days)
      .join(ud, col("day").between(date_sub(col("d"), 6), col("d")))
      .groupBy(col("d").as("day"))
      .agg(countDistinct(col("user_id")).as("wau"))
    dau.join(wau, Seq("day"))
      .select(col("day"), col("dau"), col("wau"),
        (col("dau").cast("double") / col("wau")).as("stickiness"))
      .orderBy("day")
  }

  /** Sliding-window activity: 1-hour windows advancing every 15
    * minutes (each event lands in 4 overlapping windows) — the
    * trailing-indicator grain dashboards read. Spark's native
    * `window(ts, len, slide)` generator; the oracle replicates the
    * epoch-aligned window starts at µs precision.
    */
  def slidingActivity(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        dbl(sum(col("value").cast(DecimalType(18, 6)))).as("total_value"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("event_type"), col("n_events"), col("total_value"))
      .orderBy("window_start", "event_type")

  /** New-vs-returning users per ISO week: a user is "new" in their
    * first-activity week, "returning" in every later active week —
    * the growth-accounting twin of [[cohortRetention]] (weekly for the
    * same reason: the history spans ~a month). Two shuffles (per-user
    * distinct weeks, then the weekly rollup), both on well-distributed
    * keys.
    */
  def newVsReturning(events: DataFrame): DataFrame = {
    val aw = trunc(to_date(col("ts")), "week")
    val activity = events.select(col("user_id"), aw.as("activity_week")).distinct()
    val firstWeek = activity.groupBy("user_id")
      .agg(min(col("activity_week")).as("first_week"))
    activity.join(firstWeek, Seq("user_id"))
      .groupBy(col("activity_week").as("week"))
      .agg(count(lit(1)).as("n_active"),
        count(when(col("activity_week") === col("first_week"), 1)).as("n_new"))
      .withColumn("n_returning", col("n_active") - col("n_new"))
      .orderBy("week")
  }

  /** Per-type anomaly profile: moments computed from exact decimal
    * sums (mean/std via the explicit two-moment formula — engine
    * stddev implementations differ numerically, Σ/Σ² don't), then
    * |z| > 3 outlier counts in a second conditional pass.
    */
  def valueAnomalies(events: DataFrame): DataFrame = {
    val vDec = col("value").cast(DecimalType(18, 6))
    val moments = events.groupBy("event_type").agg(
      count(lit(1)).as("n"),
      dbl(sum(vDec)).as("s1"),
      sum(vDec * vDec).cast("double").as("s2"))
      .select(col("event_type").as("et"), col("n"),
        (col("s1") / col("n")).as("mean_value"),
        sqrt((col("s2") - col("s1") * col("s1") / col("n")) / (col("n") - 1))
          .as("std_value"))
    events.join(broadcast(moments), col("event_type") === col("et"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        // publish rounded moments: the exact decimal→double conversion
        // differs by 1 ulp across runtimes (JDK BigDecimal vs DuckDB)
        round(first(col("mean_value")), 6).as("mean_value"),
        round(first(col("std_value")), 6).as("std_value"),
        count(when(abs(col("value") - col("mean_value")) >
          col("std_value") * 3, 1)).as("n_outliers"))
      .orderBy("event_type")
  }

  /** Tumbling 1-hour aggregate — the batch twin of the streaming
    * pipeline in graft.streaming.EventStream.
    */
  def hourly(events: DataFrame): DataFrame =
    events
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        dbl(sum(col("value").cast(DecimalType(18, 6)))).as("total_value"))
      .orderBy("hour", "event_type")

  /** depth md5-derived count-min hash buckets of `k` — engine-free
    * randomness (the LSH-plane convention), so the oracle embeds the
    * identical hash family.
    */
  private def cmsBuckets(k: org.apache.spark.sql.Column, depth: Int, width: Int) =
    (0 until depth).map { i =>
      struct(lit(i.toLong).as("i"),
        (conv(substring(md5(concat(lit(s"cms$i:"), k.cast("string"))
          .cast("binary")), 1, 15), 16, 10).cast("long") % width).as("b"))
    }

  /** Count-min-sketch heavy hitters over the event stream (Cormode &
    * Muthukrishnan 2005) — the frequency summary a stream warehouse
    * keeps when exact per-key counts don't fit: a depth×width cell
    * grid (3×1024 here — 3 KB regardless of stream size) where every
    * event increments one md5-derived bucket per row, and a key's
    * estimate is the MIN over its cells, an overestimate-only bound
    * (collisions inflate, never deflate — spec-asserted against the
    * exact counts). The sketch is a map-side-combined aggregate
    * (partials absorb the corpus; the shuffle carries ≤ 3·width rows
    * per partition) and cell counts are ASSOCIATIVE Long sums — the
    * covariance-term state class, mergeable across partitions, days,
    * or streaming triggers. Probing broadcasts the 3,072-cell sketch
    * against the distinct-key table. The output publishes est next to
    * exact (feasible at fixture scale) so the error profile is
    * measurable; top-N by (estimate, key) keeps the limit
    * deterministic.
    */
  def heavyHittersCms(events: DataFrame, depth: Int = 3, width: Int = 1024,
                      topN: Int = 50): DataFrame = {
    val users = events.groupBy("user_id").agg(count(lit(1)).as("n_events"))
    users
      .select(col("user_id"), col("n_events"),
        explode(array(cmsBuckets(col("user_id"), depth, width): _*)).as("p"))
      .join(broadcast(cmsCells(events, depth, width)),
        col("p.i") === col("i") && col("p.b") === col("b"))
      .groupBy("user_id", "n_events")
      .agg(min(col("cnt")).as("cms_est"))
      .orderBy(col("cms_est").desc, col("user_id"))
      .limit(topN)
  }

  /** The (i, b, cnt) sketch-cell STATE behind [[heavyHittersCms]] —
    * associative Long sums ([[mergeCmsCells]]): the whole sketch is
    * ≤ depth·width rows however large the stream, the canonical
    * bounded-state summary.
    */
  def cmsCells(events: DataFrame, depth: Int = 3, width: Int = 1024): DataFrame =
    events
      .select(explode(array(cmsBuckets(col("user_id"), depth, width): _*)).as("c"))
      .groupBy(col("c.i").as("i"), col("c.b").as("b"))
      .agg(count(lit(1)).as("cnt"))

  def mergeCmsCells(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy("i", "b").agg(sum(col("cnt")).as("cnt"))

  /** Incremental heavy-hitter probe: a standing corpus (as its
    * [[cmsCells]] sketch) plus an ARRIVING batch — merge the batch's
    * sketch into the state (exactly associative) and rank only the
    * BATCH's keys against the full history. Deliberately keeps NO
    * per-key exact counts: carrying them would defeat the sketch's
    * reason to exist — the bounded 3·width-cell state IS the steady-
    * state memory, and the batch-key restriction is what the one-shot
    * oracle states literally (full-corpus cells, batch-key probes).
    */
  def heavyHittersCmsIncremental(corpus: DataFrame, batch: DataFrame,
      depth: Int = 3, width: Int = 1024, topN: Int = 50): DataFrame =
    probeCmsCells(mergeCmsCells(cmsCells(corpus, depth, width),
      cmsCells(batch, depth, width)), batch, depth, width, topN)

  /** Per-day distinct-user estimate via GROUPED HyperLogLog — the
    * warehouse shape of [[graft.operators.TextOps.vocabHllRegisters]]:
    * one register table PER GROUP (day, bucket, max_rank — ≤256 short
    * rows per day regardless of traffic), so a year of 100 TB event
    * logs keeps per-day distinct counts in ~93k state rows where the
    * exact form ([[dauWau]]) shuffles every distinct (day, user) pair.
    * Hashing, rank, denominator, and the micro-quantized estimator are
    * the IDENTICAL shared expressions of the corpus sketch (TextOps
    * .hllEstMicro — one arithmetic, every oracle mirrors it once); the
    * exact count is published beside the estimate for the error
    * profile (the one-shot-measurability convention; a steady-state
    * monitor carries registers only and drops it).
    */
  def dauHll(events: DataFrame): DataFrame = {
    val h = conv(substring(md5(col("user_id").cast("string").cast("binary")), 1, 15),
      16, 10).cast("long")
    val regs = events
      .select(to_date(col("ts")).as("day"), shiftright(h, 52).as("bucket"),
        h.bitwiseAND(lit(4503599627370495L)).as("rem"))
      .select(col("day"), col("bucket"),
        when(col("rem") === 0, lit(53))
          .otherwise(lit(53) - length(bin(col("rem")))).cast("long").as("rank"))
      .groupBy("day", "bucket").agg(max(col("rank")).as("max_rank"))
    val exact = events
      .groupBy(to_date(col("ts")).as("day"))
      .agg(countDistinct(col("user_id")).as("n_exact"))
    regs.groupBy("day")
      .agg(count(lit(1)).as("n_nonzero"), graft.operators.TextOps.hllDObs)
      .select(col("day"), col("n_nonzero"),
        graft.operators.TextOps.hllDenomScaled.as("denom_scaled"))
      .select(col("day"), col("n_nonzero"), col("denom_scaled"),
        graft.operators.TextOps.hllEstMicro(col("n_nonzero"), col("denom_scaled"))
          .as("est_micro"))
      .join(exact, Seq("day"))
      .orderBy("day")
  }

  /** Probe a materialized cell table with a key set — the shared tail
    * of the incremental op and the streaming twin (which carries the
    * cells as state and must not recompute them): estimate = MIN over
    * the key's depth cells, top-N by (est desc, key).
    */
  def probeCmsCells(cells: DataFrame, keys: DataFrame,
      depth: Int = 3, width: Int = 1024, topN: Int = 50): DataFrame =
    keys.select(col("user_id")).distinct()
      .select(col("user_id"),
        explode(array(cmsBuckets(col("user_id"), depth, width): _*)).as("p"))
      .join(broadcast(cells), col("p.i") === col("i") && col("p.b") === col("b"))
      .groupBy("user_id")
      .agg(min(col("cnt")).as("cms_est"))
      .orderBy(col("cms_est").desc, col("user_id"))
      .limit(topN)
}
