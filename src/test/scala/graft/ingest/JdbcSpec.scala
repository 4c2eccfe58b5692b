package graft.ingest

import java.sql.DriverManager

import graft.SparkSpec

/** Real JDBC round trip against embedded Derby (ships with Spark): verifies
  * the partitioned parallel read (S5) and the incremental subquery pushdown
  * (S6) actually execute, not just compile.
  */
class JdbcSpec extends SparkSpec {

  private lazy val url: String = {
    val dbDir = tmpDir("derby").resolve("db").toString
    val u = s"jdbc:derby:$dbDir;create=true"
    val conn = DriverManager.getConnection(u)
    val st = conn.createStatement()
    st.execute("CREATE TABLE people (id BIGINT, name VARCHAR(32), updated_at VARCHAR(10))")
    (1 to 100).foreach(i =>
      st.execute(s"INSERT INTO people VALUES ($i, 'p$i', '2024-01-${i % 28 + 1}')"))
    st.close(); conn.close()
    u
  }

  private val driver = "org.apache.derby.jdbc.EmbeddedDriver"

  test("partitioned parallel JDBC scan reads all rows across partitions (S5)") {
    val df = BatchIngest.jdbc(spark, url, "people", user = "", password = "",
      driver = driver, bounds = Some(("id", 1L, 100L, 4)))
    df.rdd.getNumPartitions shouldBe 4
    df.count() shouldBe 100
  }

  test("incremental subquery pushdown evaluates the predicate source-side (S6)") {
    // watermark on the varchar column — the reference's incremental pattern
    // quotes the value, i.e. string/timestamp watermarks
    val sub = BatchIngest.jdbcIncrementalTable("people", "updated_at", "2024-01-25")
    val df = BatchIngest.jdbc(spark, url, sub, user = "", password = "", driver = driver)
    val expected = (1 to 100).count(i => s"2024-01-${i % 28 + 1}" > "2024-01-25")
    df.count() shouldBe expected
    df.select("updated_at").collect().map(_.getString(0)).min should be > "2024-01-25"
  }

  test("unpartitioned read and dialect url building compose (S5 minimal)") {
    val df = BatchIngest.jdbc(spark, url, "people", "", "", driver)
    df.columns.map(_.toLowerCase).sorted shouldBe Array("id", "name", "updated_at")
    df.filter("id <= 5").count() shouldBe 5
  }
}
