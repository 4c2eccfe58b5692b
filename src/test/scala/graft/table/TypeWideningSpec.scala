package graft.table

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.log.{Stats, TypeWidening}

/** Type widening: metadata-only column-type growth. Invariants:
  * (1) the widen commit moves no bytes (file set identical);
  * (2) every matrix conversion reads back exactly, on BOTH parquet reader
  *     paths, for files written under the old type;
  * (3) pruning stays honest about artifacts built under the old type —
  *     the float stat "0.1" must not prune the file whose true upcast max
  *     is (double)0.1f > 0.1, and an int-hashed bloom must not drop a
  *     long-queried row;
  * (4) non-widening / guarded changes refuse loudly. */
class TypeWideningSpec extends SparkSpec {
  import spark.implicits._

  private val twProps = Map("graft.enableTypeWidening" -> "true")

  private def fresh(prefix: String, schema: StructType,
      props: Map[String, String] = twProps,
      partitionColumns: Seq[String] = Nil): LakeTable =
    LakeTable.create(spark, tmpDir(prefix).resolve("t").toString, schema,
      partitionColumns = partitionColumns, properties = props)

  test("widening matrix accepts exactly the supported conversions") {
    val yes = Seq(
      ByteType -> ShortType, ByteType -> IntegerType, ByteType -> LongType,
      ShortType -> IntegerType, ShortType -> LongType, IntegerType -> LongType,
      ByteType -> DoubleType, ShortType -> DoubleType, IntegerType -> DoubleType,
      FloatType -> DoubleType, DateType -> TimestampNTZType,
      IntegerType -> DecimalType(10, 0), IntegerType -> DecimalType(14, 4),
      LongType -> DecimalType(20, 0), LongType -> DecimalType(25, 5),
      DecimalType(5, 2) -> DecimalType(10, 2), DecimalType(5, 2) -> DecimalType(12, 4))
    val no = Seq(
      LongType -> IntegerType, IntegerType -> ShortType, DoubleType -> FloatType,
      LongType -> DoubleType, // 2^63 does not fit a double exactly
      IntegerType -> FloatType, StringType -> IntegerType, IntegerType -> StringType,
      TimestampNTZType -> DateType, TimestampType -> TimestampNTZType,
      IntegerType -> DecimalType(9, 0), // p−s < 10 cannot hold Int.MaxValue
      LongType -> DecimalType(19, 0),
      DecimalType(5, 2) -> DecimalType(5, 3), // integral digits shrink
      DecimalType(5, 2) -> DecimalType(4, 2), IntegerType -> IntegerType)
    for ((f, t) <- yes) withClue(s"$f -> $t: ")(TypeWidening.isWidening(f, t) shouldBe true)
    for ((f, t) <- no) withClue(s"$f -> $t: ")(TypeWidening.isWidening(f, t) shouldBe false)
  }

  test("widen INT->BIGINT is metadata-only and upcasts old files on read") {
    val t = fresh("tw-basic", StructType(Seq(
      StructField("k", LongType), StructField("v", IntegerType))))
    t.append(Seq((1L, 7), (2L, Int.MaxValue)).toDF("k", "v"))
    val filesBefore = t.log.snapshot().files.map(_.path).sorted
    val v = t.widenColumn("v", LongType)
    val snap = t.log.snapshot()
    snap.version shouldBe v
    snap.files.map(_.path).sorted shouldBe filesBefore // no bytes moved
    snap.schema("v").dataType shouldBe LongType
    // change recorded in field metadata (drives the pruning guards)
    TypeWidening.hasChanges(snap.schema("v")) shouldBe true
    TypeWidening.hasLossyChange(snap.schema("v")) shouldBe false
    // reader+writer feature stamped by the enabling property
    snap.protocol.readerSet should contain("typeWidening")
    snap.protocol.writerSet should contain("typeWidening")
    t.read().orderBy("k").as[(Long, Long)].collect() shouldBe
      Array((1L, 7L), (2L, Int.MaxValue.toLong))
    // appends land under the new type; both generations agree
    t.append(Seq((3L, Int.MaxValue.toLong + 5L)).toDF("k", "v"))
    t.read().agg(sum("v")).as[Long].head() shouldBe
      7L + Int.MaxValue.toLong + Int.MaxValue.toLong + 5L
  }

  test("every matrix conversion reads old files exactly, both reader paths") {
    val d0 = java.sql.Date.valueOf("2024-03-05")
    val rows = Seq((Byte.MaxValue, Short.MinValue, Int.MaxValue, 0.1f,
      BigDecimal("123.45").bigDecimal, d0))
    val schema = StructType(Seq(
      StructField("b", ByteType), StructField("s", ShortType),
      StructField("i", IntegerType), StructField("f", FloatType),
      StructField("d", DecimalType(5, 2)), StructField("dt", DateType)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(org.apache.spark.sql.Row.fromTuple), 1),
      schema)
    val t = fresh("tw-matrix", schema)
    t.append(df)
    t.widenColumn("b", IntegerType)
    t.widenColumn("s", LongType)
    t.widenColumn("i", DecimalType(14, 2))
    t.widenColumn("f", DoubleType)
    t.widenColumn("d", DecimalType(12, 4))
    t.widenColumn("dt", TimestampNTZType)
    for (vectorized <- Seq("true", "false")) {
      spark.conf.set("spark.sql.parquet.enableVectorizedReader", vectorized)
      try {
        val r = t.read().collect()(0)
        withClue(s"vectorized=$vectorized: ") {
          r.getInt(0) shouldBe Byte.MaxValue.toInt
          r.getLong(1) shouldBe Short.MinValue.toLong
          r.getDecimal(2) shouldBe new java.math.BigDecimal(Int.MaxValue).setScale(2)
          r.getDouble(3) shouldBe 0.1f.toDouble // the UPCAST, not 0.1d
          r.getDecimal(4) shouldBe new java.math.BigDecimal("123.4500")
          r.getAs[java.time.LocalDateTime](5) shouldBe d0.toLocalDate.atStartOfDay()
        }
      } finally spark.conf.set("spark.sql.parquet.enableVectorizedReader", "true")
    }
  }

  test("float->double widen disables stale min/max pruning (stat honesty)") {
    val t = fresh("tw-statlossy", StructType(Seq(
      StructField("k", LongType), StructField("r", FloatType))))
    t.append(Seq((1L, 0.1f)).toDF("k", "r"))
    // pre-widen: the file's max stat encodes as the shortest float string
    t.widenColumn("r", DoubleType)
    val f = t.log.snapshot().schema("r")
    TypeWidening.hasLossyChange(f) shouldBe true
    // (double)0.1f = 0.100000001... > 0.1d: a pruner trusting the stat
    // string "0.1" as a double bound would drop the file and lose the row
    t.read().filter(col("r") > lit(0.1d)).count() shouldBe 1L
    // and metadata-only min/max refuses the stale bound too
    Stats.exactBounds(t.log.snapshot().files, f) shouldBe None
    // integer widenings keep exact stats: pruning stays available
    val t2 = fresh("tw-statexact", StructType(Seq(
      StructField("k", LongType), StructField("v", IntegerType))))
    t2.append(Seq((1L, 5)).toDF("k", "v"))
    t2.widenColumn("v", LongType)
    Stats.exactBounds(t2.log.snapshot().files,
      t2.log.snapshot().schema("v")).map(_._2) shouldBe Some("5")
  }

  test("pruning HEALS: rewrites and fresh writes regain exact stats via change-count tags") {
    val t = fresh("tw-heal", StructType(Seq(
      StructField("k", LongType), StructField("r", FloatType))))
    t.append(Seq((1L, 0.25f)).toDF("k", "r")) // pre-widen: no tag
    t.append(Seq((3L, 0.125f)).toDF("k", "r")) // second small file → compactable
    t.widenColumn("r", DoubleType)
    val fld = t.log.snapshot().schema("r")
    Stats.exactBounds(t.log.snapshot().files, fld) shouldBe None // stale bounds
    // OPTIMIZE rewrites under the widened schema and re-collects stats —
    // the rewritten file carries the change-count tag, bounds are exact
    t.optimizeCompact()
    t.log.snapshot().files.size shouldBe 1 // the rewrite actually fired
    val files = t.log.snapshot().files
    files.foreach(_.tag(TypeWidening.tagKey(fld)) shouldBe Some("1"))
    Stats.exactBounds(files, fld).map(_._2) shouldBe Some("0.25")
    // a fresh append is exact immediately too
    t.append(Seq((2L, 0.5d)).toDF("k", "r"))
    Stats.exactBounds(t.log.snapshot().files, fld).map(_._2) shouldBe Some("0.5")
  }

  test("widen disables bloom pruning built under the old type (hash honesty)") {
    val t = fresh("tw-bloom", StructType(Seq(
      StructField("k", LongType), StructField("v", IntegerType))))
    t.setProperties(Map("graft.bloomFilter.columns" -> "v"))
    t.append((1 to 200).map(i => (i.toLong, i)).toDF("k", "v"))
    t.widenColumn("v", LongType)
    // the sidecar hashed INT values; the live column is LONG — a pruner
    // hashing the long literal would miss and drop the file
    t.read().filter(col("v") === lit(123L)).count() shouldBe 1L
  }

  test("UPDATE rewrite mixes pre- and post-widen files correctly") {
    val t = fresh("tw-dml", StructType(Seq(
      StructField("k", LongType), StructField("v", IntegerType))))
    t.append(Seq((1L, 10), (2L, 20)).toDF("k", "v")) // INT parquet
    t.widenColumn("v", LongType)
    t.append(Seq((3L, Int.MaxValue.toLong + 7L)).toDF("k", "v")) // LONG parquet
    t.update(col("k") =!= 2L, Map("v" -> (col("v") + 1L)))
    t.read().orderBy("k").as[(Long, Long)].collect() shouldBe
      Array((1L, 11L), (2L, 20L), (3L, Int.MaxValue.toLong + 8L))
    // and OPTIMIZE compacts both generations under the widened schema
    t.optimizeCompact()
    t.read().orderBy("k").as[(Long, Long)].collect() shouldBe
      Array((1L, 11L), (2L, 20L), (3L, Int.MaxValue.toLong + 8L))
  }

  test("CDF presents pre-widen sidecars and files under the widened schema") {
    val t = fresh("tw-cdf", StructType(Seq(
      StructField("k", LongType), StructField("v", IntegerType))),
      props = twProps + ("graft.enableChangeDataFeed" -> "true"))
    t.append(Seq((1L, 10), (2L, 20)).toDF("k", "v")) // v1 insert (synthesized)
    t.update(col("k") === 1L, Map("v" -> lit(11)))   // v2 sidecar under INT
    t.widenColumn("v", LongType)                     // v3 metadata-only
    t.append(Seq((3L, 30L)).toDF("k", "v"))          // v4 insert under LONG
    val ch = t.changes(0).select("k", "v", "_change_type")
    ch.schema("v").dataType shouldBe LongType
    ch.orderBy("k", "_change_type").as[(Long, Long, String)].collect() shouldBe Array(
      (1L, 10L, "insert"), (1L, 11L, "update_postimage"), (1L, 10L, "update_preimage"),
      (2L, 20L, "insert"), (3L, 30L, "insert"))
  }

  test("time travel before the widen reads the ORIGINAL type") {
    val t = fresh("tw-tt", StructType(Seq(
      StructField("k", LongType), StructField("v", IntegerType))))
    t.append(Seq((1L, 10)).toDF("k", "v"))
    t.widenColumn("v", LongType)
    t.versionAsOf(1).schema("v").dataType shouldBe IntegerType
    t.read().schema("v").dataType shouldBe LongType
  }

  test("guards: property gate, narrowing, partition/identity/generated/constraint refs") {
    val t0 = fresh("tw-gate", StructType(Seq(
      StructField("k", LongType), StructField("v", IntegerType))),
      props = Map.empty)
    the[IllegalArgumentException] thrownBy t0.widenColumn("v", LongType) should
      have message "requirement failed: type widening is disabled — SET TBLPROPERTIES " +
        "('delta.enableTypeWidening' = 'true') first"
    val t = fresh("tw-guards", StructType(Seq(
      StructField("k", LongType), StructField("p", IntegerType),
      StructField("v", LongType), StructField("w", IntegerType))),
      partitionColumns = Seq("p"))
    an[IllegalArgumentException] should be thrownBy t.widenColumn("v", IntegerType)
    an[IllegalArgumentException] should be thrownBy t.widenColumn("p", LongType)
    an[IllegalArgumentException] should be thrownBy t.widenColumn("missing", LongType)
    t.addConstraint("wpos", "w >= 0")
    an[IllegalArgumentException] should be thrownBy t.widenColumn("w", LongType)
    t.dropConstraint("wpos")
    t.widenColumn("w", LongType) // allowed once the reference is gone
    t.addIdentityColumn("uid")
    an[IllegalArgumentException] should be thrownBy t.widenColumn("uid", DecimalType(20, 0))
  }

  test("SQL surface: ALTER COLUMN TYPE widens; repeated widens accumulate records") {
    val t = fresh("tw-sql", StructType(Seq(
      StructField("k", LongType), StructField("v", ByteType))))
    t.append(Seq((1L, 3.toByte)).toDF("k", "v"))
    val sql = GraftSql(spark)
    sql.run(s"ALTER TABLE '${t.dir}' ALTER COLUMN v TYPE SMALLINT")
    sql.run(s"ALTER TABLE '${t.dir}' ALTER COLUMN v TYPE INT")
    sql.run(s"ALTER TABLE '${t.dir}' ALTER COLUMN v TYPE BIGINT")
    val f = t.log.snapshot().schema("v")
    f.dataType shouldBe LongType
    f.metadata.getMetadataArray(TypeWidening.ChangesKey).length shouldBe 3
    t.read().as[(Long, Long)].head() shouldBe ((1L, 3L))
  }
}
