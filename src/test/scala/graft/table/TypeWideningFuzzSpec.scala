package graft.table

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Differential fuzz for the widening matrix: random values (boundary-
  * biased, including non-finite floats and negative-scale decimals) are
  * written under the FROM type, the column widens, and the scan's upcast
  * must agree bit-for-bit with Spark's own `CAST(value AS to)` — on both
  * parquet reader paths. Catches any divergence between the metadata-only
  * widen and what a rewrite-based retype would have produced. */
class TypeWideningFuzzSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(97)

  private def randByte: Byte = rnd.nextInt(256).toByte
  private def randShort: Short = rnd.nextInt(65536).toShort
  private def randInt: Int = rnd.nextInt()
  private def randFloat: Float = rnd.nextInt(6) match {
    case 0 => Float.NaN
    case 1 => Float.PositiveInfinity
    case 2 => Float.NegativeInfinity
    case 3 => java.lang.Float.intBitsToFloat(rnd.nextInt()) // any bit pattern
    case _ => (rnd.nextFloat() - 0.5f) * 1e6f
  }
  private def randDec(p: Int, s: Int): java.math.BigDecimal = {
    val digits = (1 to p).map(_ => rnd.nextInt(10)).mkString
    new java.math.BigDecimal(new java.math.BigInteger(
      (if (rnd.nextBoolean()) "-" else "") + digits), s)
  }
  private def randDate: java.sql.Date =
    java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(rnd.nextInt(40000).toLong - 5000))

  private case class Case(name: String, from: DataType, to: DataType, gen: () => Any)

  private val cases = Seq(
    Case("byte->short", ByteType, ShortType, () => randByte),
    Case("byte->long", ByteType, LongType, () => randByte),
    Case("short->int", ShortType, IntegerType, () => randShort),
    Case("int->long", IntegerType, LongType, () => randInt),
    Case("int->double", IntegerType, DoubleType, () => randInt),
    Case("int->dec(14,2)", IntegerType, DecimalType(14, 2), () => randInt),
    Case("long->dec(24,3)", LongType, DecimalType(24, 3), () => rnd.nextLong()),
    Case("float->double", FloatType, DoubleType, () => randFloat),
    Case("dec(7,2)->dec(15,6)", DecimalType(7, 2), DecimalType(15, 6), () => randDec(7, 2)),
    Case("date->ts_ntz", DateType, TimestampNTZType, () => randDate))

  test("random values upcast exactly like CAST, both reader paths (12 rows x 10 conversions)") {
    for (c <- cases) {
      val values = (0 until 12).map(_ => c.gen())
      val schema = StructType(Seq(StructField("i", IntegerType), StructField("x", c.from)))
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(
          values.zipWithIndex.map { case (v, i) => Row(i, v) }, 2), schema)
      val t = LakeTable.create(spark,
        tmpDir(s"twf-${c.name.replaceAll("[^a-z0-9]", "")}").resolve("t").toString,
        schema, properties = Map("graft.enableTypeWidening" -> "true"))
      t.append(df)
      t.widenColumn("x", c.to)
      // the reference answer: Spark's own cast of the ORIGINAL values
      val expect = df.select(col("i"), col("x").cast(c.to).as("x"))
        .orderBy("i").collect().toSeq
      for (vectorized <- Seq("true", "false")) {
        spark.conf.set("spark.sql.parquet.enableVectorizedReader", vectorized)
        try {
          val got = t.read().orderBy("i").collect().toSeq
          withClue(s"${c.name} vectorized=$vectorized: ") { got shouldBe expect }
        } finally spark.conf.set("spark.sql.parquet.enableVectorizedReader", "true")
      }
    }
  }
}
