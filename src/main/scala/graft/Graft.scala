package graft

import org.apache.spark.sql.SparkSession
import graft.sources.Tables

/** User-facing facade: one call wires a session for SQL-first use —
  * every star-schema table as a temp view, the custom `cosine_sim`
  * function, and the as-of planner strategy. After this,
  * `spark.sql("SELECT ... FROM lineitem ...")` works against the
  * parquet layout directly.
  */
object Graft {
  val tableNames: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def registerViews(spark: SparkSession, dir: String): Unit = {
    tableNames.foreach {
      case "events" => Tables.events(spark, dir).createOrReplaceTempView("events")
      case n => Tables(spark, dir, n).createOrReplaceTempView(n)
    }
    graft.functions.VectorExpressions.register(spark)
    graft.plans.AsOf.register(spark)
  }
}
