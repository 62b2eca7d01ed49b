package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Readers over the parquet star schema (reference extractors:
  * extractors/database_extractor.py + csv_extractor.py collapse to
  * Spark's parquet/csv/jdbc sources; schema-on-read, filters and
  * column pruning pushed to the scan by Catalyst).
  */
object Tables {
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = apply(s, d, "lineitem")
  /** The generator's `ts` physical type has drifted across rounds, so
    * normalize by the OBSERVED schema to session-zone TimestampType:
    *  - TIMESTAMP(NANOS) parquet (Spark's vectorized reader rejects
    *    it): read nanos as long (legacy conf) and floor-divide to
    *    microseconds with integer `div` (a double division would lose
    *    precision at 1e18; sub-µs truncation is the documented
    *    cross-engine contract);
    *  - TIMESTAMP(MICROS, isAdjustedToUTC=false): lands as
    *    TIMESTAMP_NTZ under Spark 4's NTZ inference — cast to
    *    TimestampType; sessions run UTC (Verify/Bench/specs), so the
    *    instant is identical to what DuckDB reads natively.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = apply(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")

  /** CSV ingest with explicit schema (the reference's CSV extractor:
    * extractors/csv_extractor.py — header, delimiter, encoding knobs;
    * explicit schema instead of inference so a malformed file fails
    * loudly and the scan stays single-pass).
    */
  def readCsv(s: SparkSession, path: String,
              schema: org.apache.spark.sql.types.StructType,
              delimiter: String = ",", header: Boolean = true): DataFrame =
    s.read.schema(schema)
      .option("header", header.toString)
      .option("sep", delimiter)
      .option("mode", "FAILFAST")
      .csv(path)

  def writeCsv(df: DataFrame, path: String, delimiter: String = ",",
               header: Boolean = true): Unit =
    df.write.mode("overwrite")
      .option("header", header.toString)
      .option("sep", delimiter)
      .csv(path)

  /** JSONL (newline-delimited JSON) — the interchange format corpora
    * actually ship in. Explicit schema + FAILFAST, like [[readCsv]]:
    * a malformed line kills the job loudly instead of silently nulling
    * a 100 TB ingest, and no schema-inference pre-pass scans the data
    * twice. Each output file is one JSONL shard, splittable and
    * parallel on both ends.
    */
  def readJsonl(s: SparkSession, path: String,
                schema: org.apache.spark.sql.types.StructType): DataFrame =
    s.read.schema(schema).option("mode", "FAILFAST").json(path)

  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** ORC — the other columnar warehouse format Spark ships natively
    * (predicate pushdown, column pruning, and vectorized reads work
    * exactly as for parquet; the scan's PushedFilters is asserted in
    * spec). Schema travels in the file, so no explicit StructType.
    * (Avro is NOT offered: the spark-avro connector jar is not part of
    * this Spark distribution, and the zero-egress environment cannot
    * resolve it.)
    */
  def readOrc(s: SparkSession, path: String): DataFrame = s.read.orc(path)

  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  /** JDBC extraction (the reference's primary source:
    * extractors/database_extractor.py:71 `extract_table` pulls each
    * table through one cursor with optional WHERE/column lists, and the
    * batch processor pages it manually). Spark-first shape: when a
    * numeric `partitionColumn` is given, the bounds are probed with one
    * MIN/MAX query and the table is read as `numPartitions` parallel
    * range slices — the distributed analogue of the reference's
    * chunking, except chunks stream concurrently into executors instead
    * of through one driver cursor. Filters/projections composed on the
    * returned DataFrame push down into the database as WHERE/SELECT
    * (asserted in JdbcSpec), so "filters" and "columns" of the
    * reference API need no dedicated parameters.
    */
  def readJdbc(s: SparkSession, url: String, table: String,
               partitionColumn: Option[String] = None,
               numPartitions: Int = 8,
               props: Map[String, String] = Map.empty): DataFrame = {
    def base = {
      val b = s.read.format("jdbc").option("url", url)
      props.foldLeft(b) { case (acc, (k, v)) => acc.option(k, v) }
    }
    partitionColumn match {
      case Some(pc) =>
        val bounds = base
          .option("dbtable", s"(SELECT MIN($pc) AS mn, MAX($pc) AS mx FROM $table) B")
          .load().head()
        if (bounds.isNullAt(0)) base.option("dbtable", table).load() // empty table
        else base.option("dbtable", table)
          .option("partitionColumn", pc)
          .option("lowerBound", bounds.get(0).toString)
          .option("upperBound", bounds.get(1).toString)
          .option("numPartitions", numPartitions.toString)
          .load()
      case None => base.option("dbtable", table).load()
    }
  }

  /** All configured tables from one source DB, keyed by name (ref
    * database_extractor.py:23 `extract_orocommerce` / :47 `extract_orocrm`
    * loop over the configured table list).
    */
  def readJdbcTables(s: SparkSession, url: String, tables: Seq[String],
                     props: Map[String, String] = Map.empty): Map[String, DataFrame] =
    tables.map(t => t -> readJdbc(s, url, t, props = props)).toMap
}
