package graft.table

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, Expression, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LocalRelation, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Delta's "metadata-only query" optimization as a Catalyst rule: a global
  * `count(*)` / `count(1)` over a bare graft scan collapses to a
  * LocalRelation holding the transaction log's row count — zero files
  * read, zero jobs run, at any table size.
  *
  * Soundness: the rule fires only on an Aggregate with no grouping whose
  * every aggregate is a non-distinct, unfiltered count of non-null
  * literals, sitting directly on the scan's LogicalRelation (attribute-only
  * Projects in between are fine — they cannot change the row count).
  * Anything else — a WHERE (Filter node), a deletion-vector table (mask
  * join above the relation), count(col) (null-sensitive), DISTINCT, a
  * FILTER clause — leaves the plan untouched and scans as usual. The file
  * list is the one captured in [[GraftFileIndex]], so the answer is
  * exactly what the replaced scan would have computed for that snapshot.
  */
object MetadataOnlyCount extends Rule[LogicalPlan] {

  private def countableScan(plan: LogicalPlan): Option[Long] = plan match {
    case lr: LogicalRelation => lr.relation match {
      case fs: HadoopFsRelation => fs.location match {
        case g: GraftFileIndex => Some(g.totalRecords)
        case _ => None
      }
      case _ => None
    }
    case Project(projList, child) if projList.forall(_.isInstanceOf[Attribute]) =>
      countableScan(child)
    case _ => None
  }

  private def isLiteralCount(e: NamedExpression): Boolean = e match {
    case Alias(ae: AggregateExpression, _) =>
      !ae.isDistinct && ae.filter.isEmpty && (ae.aggregateFunction match {
        case Count(children) => children.forall {
          case l: Literal => l.value != null
          case _ => false
        }
        case _ => false
      })
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case agg @ Aggregate(grouping, aggExprs, child, _)
        if grouping.isEmpty && aggExprs.nonEmpty && aggExprs.forall(isLiteralCount) =>
      countableScan(child) match {
        case Some(n) =>
          LocalRelation(agg.output, Seq(InternalRow.fromSeq(agg.output.map(_ => n))))
        case None => agg
      }
  }

  /** Idempotently hook the rule into the session's optimizer. */
  private[graft] def register(spark: SparkSession): Unit = {
    val em = spark.experimental
    if (!em.extraOptimizations.contains(MetadataOnlyCount))
      em.extraOptimizations = em.extraOptimizations :+ MetadataOnlyCount
  }
}
