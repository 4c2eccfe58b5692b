package graft.log

import org.apache.spark.sql.functions._
import org.roaringbitmap.longlong.Roaring64Bitmap

import graft.SparkSpec

/** The deletion-vector bitmap kernel in isolation: serialization
  * round-trips, the typed aggregates against a plain collect-based model,
  * the explode path, and the codegen'd mask filter. */
class DvBitmapSpec extends SparkSpec {
  import spark.implicits._

  test("serialize/deserialize round-trips, including >2^31 positions") {
    val bm = new Roaring64Bitmap()
    val positions = Seq(0L, 1L, 7L, 1000000L, Int.MaxValue.toLong + 17L, 1L << 40)
    positions.foreach(bm.addLong)
    val back = DvBitmap.deserialize(DvBitmap.serialize(bm))
    positions.foreach(p => assert(back.contains(p), s"lost position $p"))
    back.getLongCardinality shouldBe positions.size.toLong
    assert(!back.contains(2L))
  }

  test("aggPositions builds per-group bitmaps matching a collect-based model") {
    val rows = (0 until 10000).map(i => (s"f${i % 7}", i.toLong * 3))
    val df = rows.toDF("__file", "__idx").repartition(8)
    val got = df.groupBy("__file")
      .agg(DvBitmap.aggPositions(col("__idx")).as("__bitmap"))
      .withColumn("__n", DvBitmap.cardinality(col("__bitmap")))
      .collect()
      .map(r => r.getString(0) -> (r.getAs[Array[Byte]](1), r.getLong(2)))
      .toMap
    val model = rows.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    got.keySet shouldBe model.keySet
    model.foreach { case (f, idxs) =>
      val (bytes, n) = got(f)
      n shouldBe idxs.size.toLong
      val bm = DvBitmap.deserialize(bytes)
      idxs.foreach(i => assert(bm.contains(i)))
      assert(!bm.contains(1L)) // idx*3 never equals 1
    }
  }

  test("aggOr unions bitmaps; toLongArray explodes back sorted") {
    def ser(idxs: Seq[Long]): Array[Byte] = {
      val bm = new Roaring64Bitmap(); idxs.foreach(bm.addLong); DvBitmap.serialize(bm)
    }
    val df = Seq(
      ("a", ser(Seq(1L, 5L))), ("a", ser(Seq(5L, 9L))), ("b", ser(Seq(2L))))
      .toDF("__path", "__bitmap")
    val merged = df.groupBy("__path")
      .agg(DvBitmap.aggOr(col("__bitmap")).as("__bitmap"))
    val arr = merged
      .select(col("__path"), DvBitmap.toLongArray(col("__bitmap")).as("idxs"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    arr("a") shouldBe Seq(1L, 5L, 9L) // deduped + sorted
    arr("b") shouldBe Seq(2L)
  }

  test("notMasked filter drops exactly the masked (file, idx) pairs") {
    def ser(idxs: Seq[Long]): Array[Byte] = {
      val bm = new Roaring64Bitmap(); idxs.foreach(bm.addLong); DvBitmap.serialize(bm)
    }
    val bc = spark.sparkContext.broadcast(Map(
      "/data/f0" -> ser(Seq(1L, 3L)), "/data/f1" -> ser(Seq(0L))))
    val rows = for (f <- 0 to 2; i <- 0L to 4L) yield (s"/data/f$f", i)
    val df = rows.toDF("__file", "__idx")
    val kept = df.filter(DvBitmap.notMasked(col("__file"), col("__idx"), bc, 3L))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    kept should not contain ("/data/f0" -> 1L)
    kept should not contain ("/data/f0" -> 3L)
    kept should not contain ("/data/f1" -> 0L)
    kept.size shouldBe 15 - 3 // f2 is unmasked entirely
  }

  test("stripPathCol mirrors Stats.stripScheme on encoded file: URIs") {
    val cases = Seq(
      "file:/root/plain/part-0.parquet",
      "file:///root/slashes/part-0.parquet",
      "file:/root/t%20dir/k%3D1/part%25x.parquet", // space, '=', '%'
      "file:/root/plus+name/part-0.parquet",       // '+' must stay literal
      "hdfs://nn:8020/other/scheme.parquet",       // untouched
      "/root/already/stripped.parquet")
    val got = cases.toDF("__file")
      .select(DvBitmap.stripPathCol(col("__file")))
      .collect().map(_.getString(0))
    got should contain theSameElementsInOrderAs cases.map(Stats.stripScheme)
  }
}
