package graft

import java.sql.DriverManager
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Tables

/** JDBC source against an embedded Derby test double (the reference's
  * primary extract path is Postgres — database_extractor.py; Derby
  * stands in as the in-process JDBC endpoint, same contract).
  */
class JdbcSpec extends AnyFunSuite {
  import TestSpark._

  private val dbDir = java.nio.file.Files.createTempDirectory("graft_derby").toString + "/db"
  private val url = s"jdbc:derby:$dbDir;create=true"
  private val props = Map("driver" -> "org.apache.derby.jdbc.EmbeddedDriver")

  private lazy val seeded: Unit = {
    val conn = DriverManager.getConnection(url)
    val st = conn.createStatement()
    st.execute("CREATE TABLE orders_src (id INT PRIMARY KEY, amount DOUBLE, status VARCHAR(8))")
    val ps = conn.prepareStatement("INSERT INTO orders_src VALUES (?, ?, ?)")
    (1 to 1000).foreach { i =>
      ps.setInt(1, i); ps.setDouble(2, i * 1.5)
      ps.setString(3, if (i % 3 == 0) "OPEN" else "DONE")
      ps.addBatch()
    }
    ps.executeBatch()
    st.execute("CREATE TABLE tiny_dim (id INT PRIMARY KEY, name VARCHAR(16))")
    st.execute("INSERT INTO tiny_dim VALUES (1, 'alpha'), (2, 'beta')")
    conn.close()
  }

  test("partitioned jdbc read: parallel range slices cover the table exactly") {
    seeded
    val df = Tables.readJdbc(spark, url, "orders_src",
      partitionColumn = Some("id"), numPartitions = 4, props = props)
    assert(df.rdd.getNumPartitions === 4, "bounded read must split into range slices")
    assert(df.count() === 1000)
    // no row lost or duplicated across slice boundaries
    assert(df.agg(countDistinct(col("id"))).head.getLong(0) === 1000)
  }

  test("filters and projection push into the database query") {
    seeded
    val df = Tables.readJdbc(spark, url, "orders_src", props = props)
      .filter(col("AMOUNT") > 600.0).select("ID", "AMOUNT")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters:") && plan.contains("GreaterThan(AMOUNT,600.0)"),
      s"WHERE must reach the database:\n$plan")
    assert(df.count() === 600)
  }

  test("multi-table extract mirrors the reference's per-source table loop") {
    seeded
    val m = Tables.readJdbcTables(spark, url, Seq("orders_src", "tiny_dim"), props)
    assert(m.keySet === Set("orders_src", "tiny_dim"))
    assert(m("tiny_dim").count() === 2)
  }

  test("empty table with partition column degrades to a plain read") {
    seeded
    val conn = DriverManager.getConnection(url)
    conn.createStatement().execute("CREATE TABLE empty_t (id INT, v DOUBLE)")
    conn.close()
    val df = Tables.readJdbc(spark, url, "empty_t",
      partitionColumn = Some("id"), props = props)
    assert(df.count() === 0)
  }
}
