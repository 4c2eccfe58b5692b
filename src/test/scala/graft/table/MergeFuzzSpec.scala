package graft.table

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Differential MERGE fuzz: random targets/sources/clause sets run through
  * the engine and compared row-for-row against a plain-Scala model of
  * Delta's semantics (first matching clause wins; unmatched target rows
  * copy; unmatched source rows insert through the first passing insert
  * clause or drop). Seeds are chosen to exercise every execution path:
  * the low-shuffle fast path (distinct source keys, pure equi condition),
  * the general full-outer path (clause conditions force nothing — the
  * fast path handles them — so a duplicate TARGET key set is used), and
  * the deletion-vector path (same semantics, masked writes). */
object MergeFuzzSpec {
  case class R(k: Long, v: Long, s: String)
}

class MergeFuzzSpec extends SparkSpec {
  import spark.implicits._
  import MergeFuzzSpec.R

  /** The reference model. Clause conditions are (targetRow, sourceRow) =>
    * Boolean; update produces the new row. */
  private case class Clauses(
      matched: Seq[(String, (R, R) => Boolean)], // "update" | "delete"
      insertCond: Option[R => Boolean],
      hasInsert: Boolean)

  private def updateOf(t: R, s: R): R = R(t.k, s.v + 1000, s.s)

  private def model(target: Seq[R], source: Seq[R], c: Clauses): Seq[R] = {
    val byKey = source.groupBy(_.k)
    val out = Seq.newBuilder[R]
    target.foreach { t =>
      byKey.get(t.k).map(_.head) match {
        case Some(s) =>
          c.matched.find { case (_, cond) => cond(t, s) } match {
            case Some(("update", _)) => out += updateOf(t, s)
            case Some(("delete", _)) => () // dropped
            case _ => out += t // matched but no clause fired -> copy
          }
        case None => out += t
      }
    }
    if (c.hasInsert) {
      val tks = target.map(_.k).toSet
      source.filterNot(s => tks.contains(s.k))
        .filter(s => c.insertCond.forall(_(s)))
        .foreach(out += _)
    }
    out.result()
  }

  private def run(
      target: Seq[R], source: Seq[R], dv: Boolean,
      build: MergeBuilder => MergeBuilder, c: Clauses): Unit = {
    val t = LakeTable.createFrom(spark,
      tmpDir("mfz").resolve("t").toString, target.toDF(),
      properties = if (dv) Map("graft.enableDeletionVectors" -> "true") else Map.empty)
    build(t.merge(source.toDF().alias("source"),
      col("target.k") === col("source.k"))).execute()
    val got = t.read().as[R].collect().sortBy(r => (r.k, r.v, r.s))
    val want = model(target, source, c).sortBy(r => (r.k, r.v, r.s))
    got shouldBe want
  }

  private def rows(rnd: scala.util.Random, n: Int, keyRange: Int): Seq[R] =
    Seq.fill(n)(R(rnd.nextInt(keyRange).toLong, rnd.nextInt(100).toLong,
      s"s${rnd.nextInt(5)}"))

  private def distinctKeys(rs: Seq[R]): Seq[R] =
    rs.groupBy(_.k).values.map(_.head).toSeq

  test("fast path: updateAll+insertAll, distinct source keys") {
    for (seed <- 1 to 4) {
      val rnd = new scala.util.Random(seed)
      val target = distinctKeys(rows(rnd, 40, 60))
      val source = distinctKeys(rows(rnd, 30, 90))
      run(target, source, dv = false,
        b => b.whenMatchedUpdate(Map("v" -> (col("source.v") + 1000),
            "s" -> col("source.s")))
          .whenNotMatchedInsertAll(),
        Clauses(Seq("update" -> ((_, _) => true)), None, hasInsert = true))
    }
  }

  test("conditional clauses: update-if-even, delete-if-big, guarded insert") {
    for (seed <- 5 to 8) {
      val rnd = new scala.util.Random(seed)
      val target = distinctKeys(rows(rnd, 50, 70))
      val source = distinctKeys(rows(rnd, 40, 100))
      run(target, source, dv = false,
        b => b
          .whenMatchedUpdate(Map("v" -> (col("source.v") + 1000),
            "s" -> col("source.s")), condition = Some(col("target.v") % 2 === 0))
          .whenMatchedDelete(condition = Some(col("source.v") > 50))
          .whenNotMatchedInsert(
            Map("k" -> col("source.k"), "v" -> col("source.v"), "s" -> col("source.s")),
            condition = Some(col("source.v") < 80)),
        Clauses(
          Seq("update" -> ((t: R, _: R) => t.v % 2 == 0),
            "delete" -> ((_: R, s: R) => s.v > 50)),
          Some((s: R) => s.v < 80), hasInsert = true))
    }
  }

  test("duplicate target keys all update from the one matching source row") {
    for (seed <- 9 to 11) {
      val rnd = new scala.util.Random(seed)
      val target = rows(rnd, 50, 25) // duplicate target keys guaranteed
      val source = distinctKeys(rows(rnd, 20, 40))
      run(target, source, dv = false,
        b => b.whenMatchedUpdate(Map("v" -> (col("source.v") + 1000),
            "s" -> col("source.s")))
          .whenNotMatchedInsertAll(),
        Clauses(Seq("update" -> ((_, _) => true)), None, hasInsert = true))
    }
  }

  test("general full-outer path: duplicate source keys on unmatched keys insert twice") {
    for (seed <- 15 to 17) {
      val rnd = new scala.util.Random(seed)
      val target = distinctKeys(rows(rnd, 30, 40))
      // distinct keys in the target's range, plus a duplicated pair far
      // outside it: srcKeysDistinct=false disables the fast path, but no
      // target row is matched twice, so the merge proceeds and inserts BOTH
      // duplicate rows (Delta semantics)
      val dupK = 1000L + rnd.nextInt(10)
      val source = distinctKeys(rows(rnd, 25, 40)) ++
        Seq(R(dupK, 1, "d1"), R(dupK, 2, "d2"))
      run(target, source, dv = false,
        b => b.whenMatchedUpdate(Map("v" -> (col("source.v") + 1000),
            "s" -> col("source.s")))
          .whenNotMatchedInsertAll(),
        Clauses(Seq("update" -> ((_, _) => true)), None, hasInsert = true))
    }
  }

  test("deletion-vector path matches the same model") {
    for (seed <- 12 to 14) {
      val rnd = new scala.util.Random(seed)
      val target = distinctKeys(rows(rnd, 40, 60))
      val source = distinctKeys(rows(rnd, 30, 90))
      run(target, source, dv = true,
        b => b
          .whenMatchedUpdate(Map("v" -> (col("source.v") + 1000),
            "s" -> col("source.s")), condition = Some(col("target.v") % 2 === 0))
          .whenMatchedDelete(condition = Some(col("source.v") > 50))
          .whenNotMatchedInsertAll(),
        Clauses(
          Seq("update" -> ((t: R, _: R) => t.v % 2 == 0),
            "delete" -> ((_: R, s: R) => s.v > 50)),
          None, hasInsert = true))
    }
  }

  test("duplicate source keys matching one target row throw (ambiguity guard)") {
    val target = Seq(R(1, 10, "a"), R(2, 20, "b"))
    val source = Seq(R(1, 1, "x"), R(1, 2, "y")) // both match target k=1
    val t = LakeTable.createFrom(spark, tmpDir("mfzdup").resolve("t").toString,
      target.toDF())
    an[IllegalStateException] should be thrownBy {
      t.merge(source.toDF().alias("source"), col("target.k") === col("source.k"))
        .whenMatchedUpdateAll().whenNotMatchedInsertAll().execute()
    }
  }
}
