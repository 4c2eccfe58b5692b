package graft.table

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, Max, Min}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LocalRelation, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.StructType

import graft.log.Stats

/** Delta's "metadata-only query" optimization as a Catalyst rule: a global
  * `count(*)` / `count(1)` / `min(col)` / `max(col)` aggregate over a bare
  * graft scan collapses to a LocalRelation answered from the transaction
  * log — zero files read, zero jobs run, at any table size.
  *
  * Soundness: the rule fires only on an Aggregate with no grouping whose
  * EVERY aggregate is answerable — a non-distinct unfiltered count of
  * non-null literals (row count from the log), or a min/max directly over
  * a scan column whose per-file stats are provably exact
  * ([[Stats.exactBounds]]: every file carries the stat, string bounds
  * untruncated). The plan below must be the scan's LogicalRelation with
  * Projects and at most the deletion-vector mask filter in between:
  * `count(*)` stays exact under masks (totalRecords − the masks'
  * snapshot-known cardinality — Delta's metadata-only count handles DVs
  * the same way) and under arbitrary Projects (always 1:1), while min/max
  * additionally require an unmasked scan and attribute-only Projects (a
  * masked row may hold the extreme; an alias could rebind a column name).
  * Anything else — a WHERE (Filter node), count(col) (null-sensitive),
  * DISTINCT, a FILTER clause, min/max over an expression — leaves the
  * plan untouched and scans as usual. The file list is the one captured
  * in [[GraftFileIndex]], so answers are exactly what the replaced scan
  * would have computed for that snapshot.
  */
object MetadataOnlyCount extends Rule[LogicalPlan] {

  /** (index, maskedRows, aliased): maskedRows = Σ numDeleted of a
    * deletion-vector mask filter sitting on the scan (0 when unmasked) —
    * count(*) stays exactly answerable as totalRecords − maskedRows, while
    * min/max must refuse (a masked row may hold the extreme). `aliased`
    * marks non-attribute Projects on the path: row-count-preserving (any
    * Project is 1:1), but min/max must refuse — an alias could rebind a
    * schema column name to an arbitrary expression. */
  private def countableScan(
      plan: LogicalPlan): Option[(GraftFileIndex, Long, Boolean)] = plan match {
    case lr: LogicalRelation => lr.relation match {
      case fs: HadoopFsRelation => fs.location match {
        case g: GraftFileIndex => Some((g, 0L, false))
        case _ => None
      }
      case _ => None
    }
    case Project(projList, child) =>
      val attrOnly = projList.forall(_.isInstanceOf[Attribute])
      countableScan(child).map { case (g, m, al) => (g, m, al || !attrOnly) }
    case org.apache.spark.sql.catalyst.plans.logical.Filter(
        d: graft.log.DvNotMasked, child) =>
      countableScan(child).map { case (g, m, al) => (g, m + d.maskedTotal, al) }
    case _ => None
  }

  /** The internal-format value of one aggregate, when the log can answer
    * it exactly; None aborts the whole rewrite. */
  private def answer(e: NamedExpression, idx: GraftFileIndex,
      masked: Long, aliased: Boolean): Option[Any] = e match {
    case Alias(ae: AggregateExpression, _) if !ae.isDistinct && ae.filter.isEmpty =>
      ae.aggregateFunction match {
        case Count(children) if children.forall {
              case l: Literal => l.value != null
              case _ => false
            } =>
          Some(idx.totalRecords - masked)
        case Min(a: AttributeReference) if masked == 0 && !aliased =>
          boundsFor(a, idx).map { case (mn, _) =>
            Stats.decodeInternal(mn, a.dataType) }
        case Max(a: AttributeReference) if masked == 0 && !aliased =>
          boundsFor(a, idx).map { case (_, mx) =>
            Stats.decodeInternal(mx, a.dataType) }
        case _ => None
      }
    case _ => None
  }

  /** Exact-name match first; the case-insensitive fallback only applies
    * when it is unambiguous (under spark.sql.caseSensitive=true a schema
    * may hold two same-typed columns differing only in case — answering
    * from the wrong column's stats would be silently wrong). */
  private def boundsFor(
      a: AttributeReference, idx: GraftFileIndex): Option[(String, String)] = {
    val fields = idx.tableSchema.fields
    val field = fields.find(_.name == a.name).orElse {
      fields.filter(_.name.equalsIgnoreCase(a.name)) match {
        case Array(one) => Some(one)
        case _ => None // ambiguous under case sensitivity: refuse
      }
    }
    field.filter(_.dataType == a.dataType)
      .flatMap(Stats.exactBounds(idx.addFiles, _))
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case agg @ Aggregate(grouping, aggExprs, child, _)
        if grouping.isEmpty && aggExprs.nonEmpty =>
      countableScan(child) match {
        case Some((idx, masked, aliased)) =>
          val answers = aggExprs.map(answer(_, idx, masked, aliased))
          if (answers.forall(_.isDefined))
            LocalRelation(agg.output, Seq(InternalRow.fromSeq(answers.map(_.get))))
          else agg
        case None => agg
      }
  }

  /** Idempotently hook the rule into the session's optimizer. The
    * check-then-append is synchronized: extraOptimizations is a plain var
    * and concurrent LakeTable constructors would otherwise race into
    * duplicate registration (or drop a concurrent write).
    *
    * Caveats (by design of `experimental.extraOptimizations`): the rule is
    * SESSION-WIDE once any LakeTable is constructed and stays installed
    * after tables are discarded (harmless — it only fires on graft scans),
    * and user code that assigns extraOptimizations itself can still drop or
    * duplicate the entry (duplicate application is a no-op: the rewritten
    * LocalRelation no longer matches). Sessions that want a mutation-free
    * install should build with
    * `spark.sql.extensions=graft.table.GraftSparkExtensions` instead —
    * register() then still appends to extraOptimizations, but the redundant
    * copy is equally idempotent. */
  private[graft] def register(spark: SparkSession): Unit =
    MetadataOnlyCount.synchronized {
      val em = spark.experimental
      if (!em.extraOptimizations.contains(MetadataOnlyCount))
        em.extraOptimizations = em.extraOptimizations :+ MetadataOnlyCount
    }
}

/** Session-build-time install of graft's optimizer rules (the
  * [[org.apache.spark.sql.SparkSessionExtensions]] path):
  *
  * {{{
  * SparkSession.builder()
  *   .config("spark.sql.extensions", "graft.table.GraftSparkExtensions")
  * }}}
  *
  * Unlike the construction-time fallback ([[MetadataOnlyCount.register]]),
  * this never mutates `spark.experimental` and survives user reassignment
  * of extraOptimizations. */
class GraftSparkExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => MetadataOnlyCount)
    // native SQL UPDATE / MERGE INTO / rich-predicate DELETE on graft
    // catalog tables (sessions without the extension keep SupportsDelete
    // and the GraftSql wrapper)
    ext.injectResolutionRule(s => graft.sources.GraftDmlRule(s))
    // DESCRIBE HISTORY / DESCRIBE DETAIL through spark.sql (Delta's
    // SQL-extension surface); all other statements pass straight through
    ext.injectParser((s, delegate) => new GraftParser(s, delegate))
  }
}
