package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Skew- and layout-management utilities — the knobs a 100 TB run
  * actually turns. Kept as library functions so pipelines compose them
  * declaratively; each is spec-verified equivalent to its naive form.
  */
object Partitioning {

  /** Two-phase salted aggregation for skewed keys: groupBy(key, salt)
    * partial-aggregates hot keys across `saltBuckets` reducers, then a
    * cheap second aggregation merges the partials. Exact because the
    * measure is summed on DECIMAL. Equivalent to groupBy(key).sum —
    * spec-asserted.
    */
  def saltedSum(df: DataFrame, keys: Seq[String], valueCol: String,
                saltBuckets: Int = 16): DataFrame = {
    val keyCols = keys.map(col)
    df.withColumn("__salt", pmod(spark_partition_id() + monotonically_increasing_id(),
        lit(saltBuckets)))
      .groupBy(keyCols :+ col("__salt"): _*)
      .agg(sum(col(valueCol).cast(DecimalType(18, 6))).as("__partial"),
        count(lit(1)).as("__pn"))
      .groupBy(keyCols: _*)
      .agg(sum(col("__partial")).cast("double").as(s"sum_$valueCol"),
        sum(col("__pn")).as("n_rows"))
  }

  /** Salted equi-join for Zipf-skewed keys: a term-keyed join of a
    * (doc, term) fan-out against a per-term aggregate lands every row
    * of a head term ("the" ≈ several % of all token occurrences) in ONE
    * reducer. Salting splits it: the fat side keys on
    * (key, hash(saltSrc) % factor), the slim per-key side replicates
    * `factor` ways. The join RESULT is identical — salting only splits
    * partitions — so consumers (and their oracles) are untouched;
    * deterministic belt-and-braces next to AQE's runtime skew split
    * (which only rescues sort-merge joins it can measure). Inner joins
    * only: replicated-right semantics would differ for outer sides.
    */
  def saltedEquiJoin(fat: DataFrame, slim: DataFrame, key: String,
                     saltSrc: Column, factor: Int = 8): DataFrame =
    fat.withColumn("__salt", pmod(hash(saltSrc), lit(factor)))
      .join(slim.withColumn("__salt",
        explode(sequence(lit(0), lit(factor - 1)))),
        Seq(key, "__salt"))
      .drop("__salt")

  /** Hive-style partitioned parquet layout (partition pruning at scan). */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)

  /** Explicit co-partitioning of two frames on their join key — the
    * repartition both sides share so the join is a local zip of
    * pre-shuffled partitions (the manual form of bucketing when no
    * catalog is available).
    */
  def coPartition(a: DataFrame, b: DataFrame, aKey: String, bKey: String,
                  n: Int): (DataFrame, DataFrame) =
    (a.repartition(n, col(aKey)), b.repartition(n, col(bKey)))

  /** Key-skew diagnostic: per-key share of the table for the heaviest
    * keys plus the skew factor (max/avg key population) — the number
    * that decides whether a join needs salting or AQE skew handling.
    * One aggregation; the global count rides along via a broadcast
    * 1-row aggregate.
    */
  def keySkewProfile(df: DataFrame, keys: Seq[String], topN: Int = 10): DataFrame = {
    val perKey = df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("n_rows"))
    val global = perKey.agg(sum(col("n_rows")).as("total_rows"),
      count(lit(1)).as("n_keys"), max(col("n_rows")).as("max_rows"))
    perKey.crossJoin(broadcast(global))
      .select(keys.map(col) :+
        col("n_rows") :+
        (col("n_rows").cast("double") / col("total_rows")).as("share") :+
        (col("max_rows").cast("double") * col("n_keys") / col("total_rows"))
          .as("skew_factor"): _*)
      .orderBy(col("n_rows").desc +: keys.map(col): _*)
      .limit(topN)
  }

  /** 16-bit → even-bit Morton spread via the classic magic-number
    * shift-mask ladder (public-domain bit-twiddling identity). Pure
    * arithmetic on the Column — whole-stage codegen'd, constant masks
    * folded; no custom Expression needed because every step is a
    * built-in integral op.
    */
  private def spread16(c: Column): Column = {
    val s0 = c.bitwiseAND(lit(0xFFFFL))
    val s1 = s0.bitwiseOR(shiftleft(s0, 8)).bitwiseAND(lit(0x00FF00FFL))
    val s2 = s1.bitwiseOR(shiftleft(s1, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val s3 = s2.bitwiseOR(shiftleft(s2, 2)).bitwiseAND(lit(0x33333333L))
    s3.bitwiseOR(shiftleft(s3, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** Z-order (Morton) key interleaving the low 16 bits of two
    * dimensions: sorting by it clusters rows that are close in BOTH
    * columns, so parquet footer min/max stats stay tight on both and a
    * scan filtered on either dimension skips most files — multi-column
    * data skipping without an index, the standard lakehouse layout
    * trick for 100 TB fact tables queried on more than one key.
    */
  def zOrderKey(x: Column, y: Column): Column =
    spread16(x).bitwiseOR(shiftleft(spread16(y), 1))

  /** Z-ordered parquet layout: range-partition + sort by the Morton
    * key of the two cluster columns, so each output file covers a
    * compact rectangle of the (x, y) key space. The write is one range
    * exchange (sampled bounds) + a per-partition sort — the same cost
    * as any global sort, paid once at load time.
    */
  def writeZOrdered(df: DataFrame, path: String, xCol: String, yCol: String,
                    nFiles: Int): Unit = {
    val z = zOrderKey(col(xCol), col(yCol))
    df.withColumn("__z", z)
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  /** Z-locality profile of the lineitem (partkey, suppkey) plane:
    * bucket by the top Morton bits and report each bucket's row count
    * and per-dimension bounding box — the direct measure of how tight
    * file-level min/max stats would be under a z-ordered layout.
    */
  def zOrderLayout(lineitem: DataFrame): DataFrame = {
    val x = col("l_partkey") % 65536
    val y = col("l_suppkey") % 65536
    lineitem.select(x.as("x"), y.as("y"),
        shiftright(zOrderKey(col("l_partkey") % 65536, col("l_suppkey") % 65536), 20)
          .as("z_bucket"))
      .groupBy("z_bucket")
      .agg(count(lit(1)).as("n_rows"),
        min(col("x")).as("min_x"), max(col("x")).as("max_x"),
        min(col("y")).as("min_y"), max(col("y")).as("max_y"))
      .orderBy("z_bucket")
  }

  /** Catalog-backed bucketed table: rows hash-clustered (and optionally
    * sorted) by the join key at write time, so every later join or
    * aggregation on that key reads co-located buckets and skips the
    * shuffle entirely. This is the durable form of [[coPartition]] and
    * the documented scale path for the lineitem⋈orders orderkey join
    * (Facts.factSales) — at 100 TB the big-side shuffle is paid ONCE at
    * load, not per query. Spec asserts a bucketed-⋈-bucketed join plans
    * with zero Exchange operators.
    */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    nBuckets: Int, sortCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite").format("parquet")
      .bucketBy(nBuckets, bucketCol)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .saveAsTable(table)
  }
}
