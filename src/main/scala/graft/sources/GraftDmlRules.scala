package graft.sources

import org.apache.spark.sql.{Column, Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{EliminateSubqueryAliases, UnresolvedAttribute}
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, AttributeSet, Expression, SubqueryExpression}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.functions.lit
import org.apache.spark.sql.graft.ColumnExpr

import graft.table.LakeTable

/** Native SQL row-level DML on graft catalog tables — the route Delta takes
  * (DeltaAnalysis): an extended RESOLUTION rule converts analyzed
  * `UPDATE` / `MERGE INTO` / predicate-rich `DELETE` plans over a graft V2
  * relation into engine commands, before Spark's planner would reject them
  * (the V2 group-based row-level path needs `SupportsRowLevelOperations`,
  * whose copy-on-write write contract cannot see the whole-commit picture
  * the engine's two-phase MERGE and DV masks need). Spark's own
  * `RewriteUpdateTable`/`RewriteMergeIntoTable` sit earlier in the same
  * resolution batch and skip non-row-level tables, so there is no overlap.
  *
  * Resolved attribute references are rewritten back to NAME-based columns
  * (`target.x` / `source.x` for MERGE — the engine builder's convention),
  * so the engine re-resolves them against its own scans. Simple DELETEs
  * still flow through [[GraftV2Table]]'s `SupportsDelete` in sessions
  * without the extension; with it, this rule also unlocks arbitrary
  * (non-subquery) delete predicates that the Filter API cannot express.
  *
  * Installed by `graft.table.GraftSparkExtensions`
  * (`spark.sql.extensions=graft.table.GraftSparkExtensions`, set by
  * [[graft.core.Sessions]]).
  */
case class GraftDmlRule(session: SparkSession) extends Rule[LogicalPlan] {

  private def graftLake(plan: LogicalPlan): Option[LakeTable] =
    EliminateSubqueryAliases(plan) match {
      case DataSourceV2Relation(t: GraftV2Table, _, _, _, _, _) if t.asOfVersion.isEmpty =>
        Some(t.lake)
      case _ => None
    }

  private def hasSubquery(e: Expression): Boolean =
    e.exists(_.isInstanceOf[SubqueryExpression])

  /** Resolved expression → name-based Column (single-table commands). */
  private def nameBased(e: Expression): Column =
    ColumnExpr.toColumn(e.transform {
      case a: AttributeReference => UnresolvedAttribute(Seq(a.name))
    })

  /** Resolved expression → alias-qualified Column for the merge builder:
    * target attributes become `target.x`, source attributes `source.x`. */
  private def sided(e: Expression, tgt: AttributeSet, src: AttributeSet): Column =
    ColumnExpr.toColumn(e.transform {
      case a: AttributeReference if tgt.contains(a) =>
        UnresolvedAttribute(Seq("target", a.name))
      case a: AttributeReference if src.contains(a) =>
        UnresolvedAttribute(Seq("source", a.name))
    })

  /** Top-level assignment keys only; nested-field assignment falls back to
    * Spark's own (unsupported-operation) path rather than mis-applying. */
  private def keyName(a: Assignment): Option[String] = a.key match {
    case ar: AttributeReference => Some(ar.name)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperators {
    case u @ UpdateTable(table, assignments, condition)
        if u.resolved && !condition.exists(hasSubquery) &&
          assignments.forall(a => keyName(a).isDefined && !hasSubquery(a.value)) =>
      graftLake(table) match {
        case Some(lake) =>
          GraftUpdateCommand(lake,
            condition.map(nameBased).getOrElse(lit(true)),
            assignments.map(a => keyName(a).get -> nameBased(a.value)).toMap)
        case None => u
      }

    case d @ DeleteFromTable(table, condition)
        if d.resolved && !hasSubquery(condition) =>
      graftLake(table) match {
        case Some(lake) => GraftDeleteCommand(lake, nameBased(condition))
        case None => d
      }

    case m: MergeIntoTable
        if m.resolved && !hasSubquery(m.mergeCondition) &&
          mergeActionsSupported(m) =>
      graftLake(m.targetTable) match {
        case Some(lake) =>
          val tgt = m.targetTable.outputSet
          val src = m.sourceTable.outputSet
          GraftMergeCommand(lake, m, (e: Expression) => sided(e, tgt, src))
        case None => m
      }
  }

  private def mergeActionsSupported(m: MergeIntoTable): Boolean = {
    def ok(actions: Seq[MergeAction]): Boolean = actions.forall {
      case UpdateAction(cond, assigns, _) =>
        !cond.exists(hasSubquery) &&
          assigns.forall(a => keyName(a).isDefined && !hasSubquery(a.value))
      case InsertAction(cond, assigns) =>
        !cond.exists(hasSubquery) &&
          assigns.forall(a => keyName(a).isDefined && !hasSubquery(a.value))
      case DeleteAction(cond) => !cond.exists(hasSubquery)
      case _ => false // star actions survive only while unresolved
    }
    ok(m.matchedActions) && ok(m.notMatchedActions) && ok(m.notMatchedBySourceActions)
  }
}

private[sources] case class GraftUpdateCommand(
    lake: LakeTable, cond: Column, set: Map[String, Column])
  extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    lake.update(cond, set)
    Seq.empty
  }
}

private[sources] case class GraftDeleteCommand(lake: LakeTable, cond: Column)
  extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    lake.delete(cond)
    Seq.empty
  }
}

/** Carries the analyzed MERGE plan; the builder is assembled at RUN time so
  * the source frame executes against the live session. */
private[sources] case class GraftMergeCommand(
    lake: LakeTable, merge: MergeIntoTable, toCol: Expression => Column)
  extends LeafRunnableCommand {

  override def run(spark: SparkSession): Seq[Row] = {
    val source = org.apache.spark.sql.graft.Relations.ofRows(spark, merge.sourceTable)
    var b = lake.merge(source, toCol(merge.mergeCondition))
    def setMap(assigns: Seq[Assignment]): Map[String, Column] =
      assigns.map(a => a.key.asInstanceOf[AttributeReference].name -> toCol(a.value)).toMap
    merge.matchedActions.foreach {
      case UpdateAction(cond, assigns, _) =>
        b = b.whenMatchedUpdate(setMap(assigns), cond.map(toCol))
      case DeleteAction(cond) => b = b.whenMatchedDelete(cond.map(toCol))
      case other => throw new IllegalStateException(s"unexpected matched action $other")
    }
    merge.notMatchedActions.foreach {
      case InsertAction(cond, assigns) =>
        b = b.whenNotMatchedInsert(setMap(assigns), cond.map(toCol))
      case other => throw new IllegalStateException(s"unexpected not-matched action $other")
    }
    merge.notMatchedBySourceActions.foreach {
      case UpdateAction(cond, assigns, _) =>
        b = b.whenNotMatchedBySourceUpdate(setMap(assigns), cond.map(toCol))
      case DeleteAction(cond) => b = b.whenNotMatchedBySourceDelete(cond.map(toCol))
      case other => throw new IllegalStateException(s"unexpected by-source action $other")
    }
    if (merge.withSchemaEvolution) b = b.withSchemaEvolution()
    b.execute()
    Seq.empty
  }
}
