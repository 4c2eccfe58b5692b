package graft.migrate

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.log.{ColumnIds, TypeWidening}

/** Unit coverage of the followed-evolution schema merge — in particular
  * the ATOMIC rename+reuse shapes (one source commit renames a column
  * away AND reuses the name), where the reuse marker must consult the
  * ledger state INCLUDING this very evolution's retirements: the
  * pre-evolution ledger alone left the reusing column unmarked, so old
  * files' stats keyed by the reused name resolved for the new column —
  * wrong exact min/max answers, unsound pruning (r13 ADVICE). */
class EvolutionSpec extends AnyFunSuite with Matchers {

  private def f(name: String, id: Long, dt: DataType = LongType): StructField =
    ColumnIds.withId(StructField(name, dt), id)

  test("atomic rename + same-name add in ONE commit marks the reusing column") {
    val cur = StructType(Seq(f("id", 1), f("amount", 2, DoubleType)))
    // one metaData: amount(2) renamed to total, NEW amount added as id 3
    val incoming = StructType(Seq(
      f("id", 1), f("total", 2, DoubleType), f("amount", 3, DoubleType)))
    Evolution.requireFollowable(cur, incoming, mapped = true, "Delta")
    val (merged, props) =
      Evolution.mergedSchema(cur, incoming, mapped = true, Map.empty, 5L)
    val reused = merged.fields.find(_.name == "amount").get
    TypeWidening.nameReused(reused) shouldBe true
    reused.metadata.getLong(TypeWidening.NameReusedKey) shouldBe 2L
    TypeWidening.nameReused(merged.fields.find(_.name == "total").get) shouldBe false
    // the ledger property records the retirement for later syncs too
    ColumnIds.retiredNames(props) shouldBe Map("amount" -> 2L)
  }

  test("an atomic rename-SWAP marks both columns (each now answers for " +
    "the other's historical stats keys)") {
    val cur = StructType(Seq(f("a", 1), f("b", 2)))
    val incoming = StructType(Seq(f("b", 1), f("a", 2)))
    Evolution.requireFollowable(cur, incoming, mapped = true, "Iceberg")
    val (merged, props) =
      Evolution.mergedSchema(cur, incoming, mapped = true, Map.empty, 3L)
    merged.fields.map(_.name).toSeq shouldBe Seq("b", "a")
    merged.fields.foreach(f0 => TypeWidening.nameReused(f0) shouldBe true)
    // 'b' (id 1) distrusts stats keyed 'b' that belonged to id 2, and
    // vice versa
    merged.fields.find(_.name == "b").get.metadata
      .getLong(TypeWidening.NameReusedKey) shouldBe 2L
    merged.fields.find(_.name == "a").get.metadata
      .getLong(TypeWidening.NameReusedKey) shouldBe 1L
    ColumnIds.retiredNames(props) shouldBe Map("a" -> 1L, "b" -> 2L)
  }

  test("a rename REVERT (name back on its original id) stays unmarked " +
    "and un-retires the name") {
    val cur = StructType(Seq(f("total", 1, DoubleType)))
    val incoming = StructType(Seq(f("amount", 1, DoubleType)))
    val priorLedger = Map(ColumnIds.RetiredNamesKey ->
      ColumnIds.serializeRetired(Map("amount" -> 1L)))
    val (merged, props) =
      Evolution.mergedSchema(cur, incoming, mapped = true, priorLedger, 4L)
    TypeWidening.nameReused(merged.fields.head) shouldBe false
    // 'amount' un-retires (back on its original id); 'total' — the name
    // this revert renames AWAY — retires in its place
    ColumnIds.retiredNames(priorLedger ++ props) shouldBe Map("total" -> 1L)
  }

  test("a plain rename (no reuse) marks nothing but retires the name") {
    val cur = StructType(Seq(f("id", 1), f("amount", 2, DoubleType)))
    val incoming = StructType(Seq(f("id", 1), f("total", 2, DoubleType)))
    val (merged, props) =
      Evolution.mergedSchema(cur, incoming, mapped = true, Map.empty, 2L)
    merged.fields.foreach(f0 => TypeWidening.nameReused(f0) shouldBe false)
    ColumnIds.retiredNames(props) shouldBe Map("amount" -> 2L)
  }
}
