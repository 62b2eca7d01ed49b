package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 made Column wrap a ColumnNode and gated the
  * Expression↔Column converters behind private[sql]
  * (org.apache.spark.sql.classic.ExpressionUtils). This bridge —
  * placed under the sql package per the standard extension pattern —
  * re-exports just the two conversions custom Catalyst expressions
  * need.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Dataset.ofRows and DataFrame.logicalPlan are private[sql]; custom
    * logical operators need both to round-trip through the public API.
    */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  def logicalPlan(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]].logicalPlan

  /** localCheckpoint(eager) that ALSO counts rows satisfying the
    * boolean column `flagCol` during the one materialization job
    * (r18, VERDICT r17 #6): Dedup.clustersCore used to pay a separate
    * convergence-probe job per propagation round on top of the
    * round's checkpoint job — the count now rides the checkpoint's
    * own materialization pass via an accumulator. Accumulator
    * inflation from task retries can only OVERcount, never turn a
    * nonzero count into zero, so the `== 0` convergence test stays
    * exact. Returns the checkpointed frame and the flag count. This
    * is Dataset.localCheckpoint's own construction (executedPlan
    * .execute + row copy + RDD localCheckpoint + eager count +
    * LogicalRDD.fromDataset) with one counting map inserted before
    * the copy.
    */
  def localCheckpointCounting(df: org.apache.spark.sql.DataFrame,
                              flagCol: String)
      : (org.apache.spark.sql.DataFrame, Long) = {
    val ds = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
    val spark = ds.sparkSession
    val idx = df.schema.fieldIndex(flagCol)
    require(df.schema(idx).dataType ==
      org.apache.spark.sql.types.BooleanType,
      s"localCheckpointCounting: $flagCol must be boolean")
    val acc = spark.sparkContext.longAccumulator
    val rdd = ds.queryExecution.executedPlan.execute().mapPartitions { it =>
      it.map { r =>
        if (!r.isNullAt(idx) && r.getBoolean(idx)) acc.add(1L)
        r.copy()
      }
    }
    rdd.localCheckpoint()
    rdd.count() // eager materialization — the one job
    val out = org.apache.spark.sql.classic.Dataset.ofRows(spark,
      org.apache.spark.sql.execution.LogicalRDD
        .fromDataset(rdd, ds, isStreaming = false))
    (out, acc.value)
  }

  /** Release the storage blocks behind a localCheckpointed Dataset.
    * `Dataset.unpersist` only consults the CacheManager (df.cache
    * entries); `localCheckpoint` persists the underlying RDD directly,
    * which otherwise lives until a driver GC lets the ContextCleaner
    * reap it. Walks the plan for the LogicalRDD the checkpoint left
    * behind (the checkpointed frame itself, or projections over it)
    * and unpersists that RDD.
    *
    * WARNING — the blocks are UNRECOVERABLE: localCheckpoint truncates
    * lineage, so any OTHER live Dataset still referencing the same
    * checkpoint becomes permanently unrecomputable once the blocks are
    * dropped. Only call this when the checkpointed frame has no other
    * referents (the Dedup.clusters round loop is the model: each
    * round's checkpoint is released only after the next round's is
    * materialized and nothing else holds the old one).
    */
  def unpersistCheckpoint(df: org.apache.spark.sql.DataFrame): Unit =
    logicalPlan(df).collect {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
    }.foreach(_.unpersist(blocking = false))

  /** Census of storage blocks registered on the local BlockManager
    * (BlockManagerMaster is private[spark]; this bridge package sits
    * under org.apache.spark, the standard extension pattern). The
    * bench's settle barrier polls this after its full GC until the
    * ContextCleaner's asynchronous removal storm stops moving the
    * number — a deterministic "the cleaner has drained" signal where
    * a fixed sleep was a guess.
    */
  def numStorageBlocks: Long =
    org.apache.spark.SparkEnv.get.blockManager.master.getStorageStatus
      .map(_.blocks.size.toLong).sum

  /** Census of blocks materialized on local DISK — the storage census'
    * blind spot: shuffle data/index files never register as storage
    * blocks, so a settle barrier polling [[numStorageBlocks]] alone
    * declares "drained" while the ContextCleaner is still mid-way
    * through deleting the previous queries' shuffle files, and that
    * deletion I/O (plus the write-side block-manager lock traffic it
    * contends on) lands inside the NEXT timed rep. Counting the
    * DiskBlockManager's files folds shuffle lifecycle into the same
    * drain signal. The walk is ~64 subdirs of the local block-manager
    * dir — milliseconds, driver-side, safe to poll.
    */
  def numDiskBlocks: Long =
    try org.apache.spark.SparkEnv.get.blockManager
      .diskBlockManager.getAllBlocks().length.toLong
    catch { case _: Throwable => 0L }
}
