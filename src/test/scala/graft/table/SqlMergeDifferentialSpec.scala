package graft.table

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Differential fuzz for the MERGE INTO SQL surfaces: every generated case
  * runs the SAME merge THREE ways — as SQL text through GraftSql, through
  * the builder API, and as native `spark.sql` MERGE on a catalog table
  * (Spark's own parser + `GraftDmlRule`) — on identical copies of a random
  * initial table, and the final tables must match row-for-row. Clause sets,
  * clause conditions, and alias names are all randomized (seeded). */
class SqlMergeDifferentialSpec extends SparkSpec {
  import spark.implicits._

  private lazy val sql = GraftSql(spark)

  private lazy val warehouse = {
    val wh = tmpDir("smd-native-wh").toString
    spark.conf.set("spark.sql.catalog.gfz", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gfz.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gfz.fz")
    wh
  }

  private def freshPair(seed: Int, rows: Seq[(Long, String, Int)]): (LakeTable, LakeTable) = {
    val df = rows.toDF("id", "v", "b")
    (LakeTable.createFrom(spark, tmpDir(s"smd-sql-$seed").resolve("t").toString, df),
      LakeTable.createFrom(spark, tmpDir(s"smd-api-$seed").resolve("t").toString, df))
  }

  private def contents(t: LakeTable): Seq[(Long, String, Int)] =
    t.read().as[(Long, String, Int)].collect().sortBy(_._1).toSeq

  test("SQL MERGE matches the builder across randomized clause sets") {
    val rnd = new scala.util.Random(20260813)
    (1 to 12).foreach { seed =>
      val tgtRows = (0L until 60L).filter(_ => rnd.nextDouble() < 0.7)
        .map(i => (i, s"t$i", rnd.nextInt(10)))
      val srcRows = (0L until 80L).filter(_ => rnd.nextDouble() < 0.5)
        .map(i => (i, s"s$i", rnd.nextInt(10), rnd.nextBoolean()))
      val (tSql, tApi) = freshPair(seed, tgtRows)
      val view = s"smd_src_$seed"
      srcRows.toDF("id", "v", "b", "d").createOrReplaceTempView(view)
      val src = spark.table(view)

      val (ta, sa) = Seq(("t", "s"), ("tgt", "src"), ("x", "y"))(rnd.nextInt(3))
      // random clause set: matched delete-then-update ordering, optional
      // conditions, insert with explicit columns or *, optional NMBS clause
      val matchedDeleteCond = rnd.nextInt(3) match {
        case 0 => None                       // no delete clause
        case 1 => Some(s"$sa.d")             // conditional delete
        case _ => Some(s"$sa.b > 7")
      }
      val updateStar = rnd.nextBoolean()
      val updateCond = if (rnd.nextBoolean()) Some(s"$ta.b < 8") else None
      val insertStar = rnd.nextBoolean()
      val insertCond = if (rnd.nextBoolean()) Some(s"NOT $sa.d") else None
      val nmbs = rnd.nextInt(3) match {
        case 0 => None
        case 1 => Some(("DELETE", Some(s"$ta.b = 3")))
        case _ => Some((s"UPDATE SET b = $ta.b + 100", None))
      }

      val sb = new StringBuilder(
        s"MERGE INTO '${tSql.dir}' AS $ta USING $view AS $sa ON $ta.id = $sa.id")
      matchedDeleteCond.foreach(c => sb.append(s" WHEN MATCHED AND $c THEN DELETE"))
      sb.append(" WHEN MATCHED")
      updateCond.foreach(c => sb.append(s" AND $c"))
      sb.append(" THEN UPDATE SET ")
      sb.append(if (updateStar) "*" else s"v = $sa.v")
      sb.append(" WHEN NOT MATCHED")
      insertCond.foreach(c => sb.append(s" AND $c"))
      sb.append(" THEN INSERT ")
      sb.append(if (insertStar) "*"
        else s"(id, v, b) VALUES ($sa.id, $sa.v, $sa.b)")
      nmbs.foreach { case (action, cond) =>
        sb.append(" WHEN NOT MATCHED BY SOURCE")
        cond.foreach(c => sb.append(s" AND $c"))
        sb.append(s" THEN $action")
      }
      sql.run(sb.toString)

      // identical merge through Spark's OWN parser on a catalog table —
      // exercises GraftDmlRule end-to-end with the same random clauses
      val natName = s"gfz.fz.t$seed"
      warehouse: Unit
      spark.sql(s"DROP TABLE IF EXISTS $natName")
      tgtRows.toDF("id", "v", "b").write.saveAsTable(natName)
      spark.sql(sb.toString.replace(s"'${tSql.dir}'", natName))
      val tNative = LakeTable.forPath(spark, s"$warehouse/fz/t$seed")

      // identical merge through the builder (fixed target/source aliases)
      def rw(c: String): org.apache.spark.sql.Column =
        expr(c.replace(s"$ta.", "target.").replace(s"$sa.", "source."))
      var b = tApi.merge(src, col("target.id") === col("source.id"))
      matchedDeleteCond.foreach(c => b = b.whenMatchedDelete(Some(rw(c))))
      b = if (updateStar) b.whenMatchedUpdateAll(updateCond.map(rw))
        else b.whenMatchedUpdate(Map("v" -> col("source.v")), updateCond.map(rw))
      b = if (insertStar) b.whenNotMatchedInsertAll(insertCond.map(rw))
        else b.whenNotMatchedInsert(Map("id" -> col("source.id"),
          "v" -> col("source.v"), "b" -> col("source.b")), insertCond.map(rw))
      nmbs.foreach {
        case ("DELETE", cond) => b = b.whenNotMatchedBySourceDelete(cond.map(rw))
        case (_, cond) =>
          b = b.whenNotMatchedBySourceUpdate(
            Map("b" -> (col("target.b") + lit(100))), cond.map(rw))
      }
      b.execute()

      withClue(s"seed $seed: ${sb.toString}\n") {
        contents(tSql) shouldBe contents(tApi)
        contents(tNative) shouldBe contents(tApi)
      }
    }
  }
}
