package graft.tools

import org.apache.spark.sql.functions._

import graft.table.LakeTable

/** Local merge profiler: replicates the bench strain merge with per-phase
  * timing on, so regressions/optimizations are attributable to a phase
  * rather than to wall-clock noise. Run:
  * sbt "Test/runMain graft.tools.MergeProfile"
  */
object MergeProfile {
  def main(args: Array[String]): Unit = {
    sys.props("graft.merge.timing") = "1"
    val spark = graft.core.Sessions.local(32, "merge-profile")
    spark.sparkContext.setLogLevel("ERROR")
    val strainN = 10000000L
    val sgen = spark.range(strainN)
      .withColumn("user_id", concat(lit("user_"), col("id") % 100000))
      .withColumn("amount", (col("id") % 1000).cast("decimal(18,2)"))
      .withColumn("day", date_add(lit(java.sql.Date.valueOf("2024-01-01")),
        (col("id") % 30).cast("int")))
    val dir = java.nio.file.Files.createTempDirectory("merge-profile")
      .resolve("t").toString
    val st = LakeTable.create(spark, dir, sgen.schema)
    st.append(sgen)
    // "dv" arg: profile the deletion-vector merge path instead
    if (args.contains("dv"))
      st.setProperties(Map("graft.enableDeletionVectors" -> "true")): Unit
    (0 until 3).foreach { i =>
      val ssrc = spark.range(i, strainN, 10)
        .withColumn("user_id", concat(lit("u_"), col("id")))
        .withColumn("amount", lit(java.math.BigDecimal.valueOf(1)).cast("decimal(18,2)"))
        .withColumn("day", lit(java.sql.Date.valueOf("2024-02-01")))
      val t0 = System.nanoTime()
      st.merge(ssrc, col("target.id") === col("source.id"))
        .whenMatchedUpdateAll().whenNotMatchedInsertAll().execute()
      System.err.println(f"[merge-profile] run $i total ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
