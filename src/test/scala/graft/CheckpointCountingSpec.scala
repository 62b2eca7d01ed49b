package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.graft.ColumnBridge

/** r18 (VERDICT r17 #6): ColumnBridge.localCheckpointCounting fuses
  * Dedup.clustersCore's per-round convergence probe into the round's
  * own checkpoint job. Pins: the counted flag matches an independent
  * filter count, the checkpointed frame's contents are exactly the
  * input's, the frame survives as a materialized LogicalRDD (readable
  * after unpersisting nothing, releasable via unpersistCheckpoint),
  * and a non-boolean flag column fails fast.
  */
class CheckpointCountingSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("counts the true flags during the one materialization job; contents preserved") {
    val df = (1L to 100L).map(i => (i, i % 7 == 0L)).toDF("id", "flag")
    val expected = df.filter(col("flag")).count()
    val (cp, n) = ColumnBridge.localCheckpointCounting(df, "flag")
    assert(n === expected)
    assert(cp.schema === df.schema)
    assert(cp.exceptAll(df).count() === 0)
    assert(df.exceptAll(cp).count() === 0)
    // the frame is a materialized checkpoint: consuming it twice and
    // releasing it both go through the LogicalRDD handle
    assert(cp.count() === 100)
    ColumnBridge.unpersistCheckpoint(cp)
  }

  test("null flags are not counted; zero-change frames report zero") {
    val df = Seq((1L, Some(true)), (2L, None), (3L, Some(false)))
      .toDF("id", "flag")
    val (cp, n) = ColumnBridge.localCheckpointCounting(df, "flag")
    assert(n === 1L)
    assert(cp.count() === 3)
    val (cp0, n0) = ColumnBridge.localCheckpointCounting(
      df.select(col("id"), lit(false).as("flag")), "flag")
    assert(n0 === 0L)
    assert(cp0.count() === 3)
  }

  test("non-boolean flag column fails fast") {
    val df = Seq((1L, 2L)).toDF("id", "flag")
    intercept[IllegalArgumentException] {
      ColumnBridge.localCheckpointCounting(df, "flag")
    }
  }
}
