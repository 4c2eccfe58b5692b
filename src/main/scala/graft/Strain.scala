package graft
import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.table.LakeTable
object Strain {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Sessions.local(32, "strain")
    spark.sparkContext.setLogLevel("ERROR")
    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val a = f
      println(f"[strain] $label: ${(System.nanoTime()-t0)/1e9}%.2f s"); a
    }
    val n = sys.env.getOrElse("STRAIN_ROWS", "5000000").toLong
    val gen = spark.range(n)
      .withColumn("user_id", concat(lit("user_"), col("id") % 100000))
      .withColumn("amount", (col("id") % 1000).cast("decimal(18,2)"))
      .withColumn("day", date_add(lit(java.sql.Date.valueOf("2024-01-01")), (col("id") % 30).cast("int")))
    val dir = Files.createTempDirectory("strain").resolve("t").toString
    val t = LakeTable.create(spark, dir, gen.schema)
    timed(s"write ${n} rows")(t.append(gen))
    timed("full read agg")(t.read().agg(sum("amount")).collect())
    val src = spark.range(0, n, 10)
      .withColumn("user_id", concat(lit("u_"), col("id")))
      .withColumn("amount", lit(java.math.BigDecimal.valueOf(1)).cast("decimal(18,2)"))
      .withColumn("day", lit(java.sql.Date.valueOf("2024-02-01")))
    timed(s"merge ${n/10} upserts")(
      t.merge(src, col("target.id") === col("source.id"))
        .whenMatchedUpdateAll().whenNotMatchedInsertAll().execute())
    timed("zorder")(t.optimizeZOrder(Seq("user_id", "day")))
    timed("point query after zorder")(t.read(Seq(col("user_id") === "user_777")).count())
    println(s"[strain] files=${t.snapshot().numFiles} rows=${t.read().count()}")
    spark.stop()
  }
}
