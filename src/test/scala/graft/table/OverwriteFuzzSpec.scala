package graft.table

import org.apache.spark.sql.functions._
import scala.util.Random

import graft.SparkSpec

/** Model-based fuzz of the overwrite family on a partitioned table:
  * random sequences of append / full overwrite / replaceWhere /
  * dynamic-partition overwrite checked row-for-row against an in-memory
  * model after every step — the guard for the partition-targeting logic
  * (replaceWhere's predicate match and overwriteDynamic's staged-dirs
  * derivation), whose bugs only show against specific partition overlaps.
  * A periodic reopen forces full log replay. */
class OverwriteFuzzSpec extends SparkSpec {
  import spark.implicits._

  private val Parts = 5

  test("randomized overwrite sequences match an in-memory model (3 seeds)") {
    for (seed <- Seq(7, 19, 31)) {
      val rnd = new Random(seed)
      val dir = tmpDir(s"owfuzz$seed").resolve("t").toString
      // model: (id -> (bucket, v)); bucket is the partition column
      var model: Map[Long, (Int, Long)] = Map.empty
      var nextId = 0L
      def mk(n: Int, buckets: Seq[Int]): Seq[(Long, Int, Long)] = {
        val rows = (0 until n).map { _ =>
          val id = nextId; nextId += 1
          (id, buckets(rnd.nextInt(buckets.size)), rnd.nextInt(1000).toLong)
        }
        rows
      }
      def toDf(rows: Seq[(Long, Int, Long)]) = rows.toDF("id", "bucket", "v")
      var table = LakeTable.create(spark, dir,
        toDf(Nil).schema, partitionColumns = Seq("bucket"))

      for (step <- 0 until 14) {
        rnd.nextInt(5) match {
          case 0 | 1 => // append into random buckets
            val rows = mk(rnd.nextInt(30) + 1, 0 until Parts)
            table.append(toDf(rows))
            model ++= rows.map(r => r._1 -> (r._2, r._3))
          case 2 => // replaceWhere one bucket; incoming rows must satisfy it
            val b = rnd.nextInt(Parts)
            val rows = mk(rnd.nextInt(10), Seq(b))
            table.overwriteWhere(col("bucket") === b, toDf(rows))
            model = model.filter(_._2._1 != b) ++ rows.map(r => r._1 -> (r._2, r._3))
          case 3 => // dynamic overwrite: replaces exactly the buckets present
            val present = rnd.shuffle((0 until Parts).toList).take(rnd.nextInt(3) + 1)
            val rows = mk(rnd.nextInt(20) + 1, present)
            val touched = rows.map(_._2).toSet // empty buckets stay untouched
            table.overwriteDynamic(toDf(rows))
            model = model.filter { case (_, (b, _)) => !touched.contains(b) } ++
              rows.map(r => r._1 -> (r._2, r._3))
          case 4 => // full overwrite
            val rows = mk(rnd.nextInt(15), 0 until Parts)
            table.overwrite(toDf(rows))
            model = rows.map(r => r._1 -> (r._2, r._3)).toMap
        }
        if (step % 5 == 4) table = LakeTable.forPath(spark, dir) // replay
        val got = table.read().select("id", "bucket", "v")
          .as[(Long, Int, Long)].collect()
          .map(r => r._1 -> (r._2, r._3)).toMap
        withClue(s"seed=$seed step=$step: ") { got shouldBe model }
      }
      // partition dirs in the log stay consistent with the data
      table.snapshot().files.foreach { f =>
        f.partitionValues.keySet shouldBe Set("bucket")
      }
    }
  }
}
