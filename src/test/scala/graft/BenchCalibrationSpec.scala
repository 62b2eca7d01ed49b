package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench calibration fingerprint (r14 VERDICT #2): BENCH_FULL
  * carries a fixed workload timed at suite start and end so cross-run
  * comparisons can be normalized for box drift instead of filing
  * environment noise as regressions (r14: the driver's box ran ~21%
  * slow and 14 queries would have read as regressions without a
  * same-HEAD twin to ratio against).
  */
class BenchCalibrationSpec extends AnyFunSuite {
  import TestSpark._

  test("calibration fingerprint publishes positive, parseable probe " +
    "timings plus loadavg (r15)") {
    import spark.implicits._
    val json = Bench.calibrationJson(spark, 4)
    // a REAL json parse — the artifact consumer is json.load, so a
    // mis-escaped or truncated fingerprint must fail here
    val df = spark.read.json(Seq(json).toDS)
    val row = df.collect()(0)
    assert(df.columns.toSet === Set("jvm_spin_sec", "spark_range_agg_sec",
      "loadavg"))
    assert(row.getAs[Double]("jvm_spin_sec") > 0.0)
    assert(row.getAs[Double]("spark_range_agg_sec") > 0.0)
    // loadavg is -1.0 on platforms without it — present either way;
    // plausibility-bound it so a unit mixup (ms vs s) can't ship
    assert(row.getAs[Double]("loadavg") >= -1.0)
    assert(row.getAs[Double]("jvm_spin_sec") < 60.0)
    assert(row.getAs[Double]("spark_range_agg_sec") < 60.0)
  }

  test("the fixed workload is actually fixed: two fingerprints time " +
    "the identical work (r15)") {
    import spark.implicits._
    // no state to evict or warm beyond the first call — the two probe
    // times should be the same order of magnitude (a 10x swing on an
    // idle test JVM would mean the workload is NOT a yardstick)
    val a = spark.read.json(Seq(Bench.calibrationJson(spark, 4)).toDS)
      .collect()(0)
    val b = spark.read.json(Seq(Bench.calibrationJson(spark, 4)).toDS)
      .collect()(0)
    val ratio = a.getAs[Double]("jvm_spin_sec") / b.getAs[Double]("jvm_spin_sec")
    assert(ratio > 0.1 && ratio < 10.0,
      s"jvm spin swung ${ratio}x between back-to-back calls")
  }
}
