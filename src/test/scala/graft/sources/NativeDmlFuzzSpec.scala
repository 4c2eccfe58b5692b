package graft.sources

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.table.LakeTable

/** Differential fuzz for native SQL UPDATE / DELETE (`GraftDmlRule`):
  * random tables (rewrite-mode and DV-mode), random predicates and SET
  * expressions, each statement run BOTH as plain `spark.sql` on a catalog
  * table and through the engine API on an identical copy — final states
  * must match row-for-row. */
class NativeDmlFuzzSpec extends SparkSpec {
  import spark.implicits._

  private lazy val warehouse = {
    val wh = tmpDir("ndml-wh").toString
    spark.conf.set("spark.sql.catalog.gnf", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gnf.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gnf.fz")
    wh
  }

  private def contents(df: org.apache.spark.sql.DataFrame): Seq[(Long, Double, String)] =
    df.as[(Long, Double, String)].collect().sortBy(_._1).toSeq

  test("native UPDATE/DELETE match the API across random predicates") {
    val rnd = new Random(20260814)
    (1 to 10).foreach { seed =>
      val dv = seed % 2 == 0
      val rows = (0L until 50L).filter(_ => rnd.nextDouble() < 0.8)
        .map(i => (i, rnd.nextInt(100).toDouble, s"s${rnd.nextInt(5)}"))
      val name = s"t$seed"
      warehouse: Unit
      spark.sql(s"DROP TABLE IF EXISTS gnf.fz.$name")
      spark.sql(s"""CREATE TABLE gnf.fz.$name (id BIGINT, v DOUBLE, tag STRING)
        USING graft TBLPROPERTIES ('graft.enableDeletionVectors' = '$dv')""")
      rows.toDF("id", "v", "tag").write.mode("append").saveAsTable(s"gnf.fz.$name")
      val api = LakeTable.createFrom(spark,
        tmpDir(s"ndml-api-$seed").resolve("t").toString, rows.toDF("id", "v", "tag"),
        properties = Map("graft.enableDeletionVectors" -> dv.toString))

      // 3 random statements per seed, alternating UPDATE/DELETE
      (0 until 3).foreach { step =>
        val pred = rnd.nextInt(4) match {
          case 0 => s"id % ${2 + rnd.nextInt(5)} = 0"
          case 1 => s"v * 2 > ${rnd.nextInt(150)}"         // beyond Filter API
          case 2 => s"tag = 's${rnd.nextInt(5)}' AND v < ${rnd.nextInt(90)}"
          case _ => s"id > ${rnd.nextInt(40)} OR v = ${rnd.nextInt(100)}.0"
        }
        if ((seed + step) % 2 == 0) {
          spark.sql(s"UPDATE gnf.fz.$name SET v = v + 1000, tag = concat(tag, 'u') WHERE $pred")
          api.update(expr(pred),
            Map("v" -> (col("v") + 1000), "tag" -> concat(col("tag"), lit("u")))): Unit
        } else {
          spark.sql(s"DELETE FROM gnf.fz.$name WHERE $pred")
          api.delete(expr(pred)): Unit
        }
        withClue(s"seed=$seed step=$step dv=$dv pred=$pred: ") {
          contents(spark.table(s"gnf.fz.$name")) shouldBe contents(api.read())
        }
      }
    }
  }
}
