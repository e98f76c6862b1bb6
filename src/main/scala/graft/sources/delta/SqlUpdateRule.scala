package graft.sources.delta

import org.apache.spark.sql.{Column, Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, EqualTo, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{Assignment, InsertAction, LogicalPlan, MergeIntoTable, UpdateAction, UpdateTable}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.graft.ColumnBridge

/** SQL `UPDATE graft.ns.t SET … WHERE …` for graft-delta tables.
  *
  * Spark's own v2 UPDATE rewrite requires `SupportsRowLevelOperations`
  * (a full copy-on-write/delta-write planning framework); the engine
  * already HAS a row-level UPDATE ([[DeltaTable.update]]: stats +
  * partition candidate pruning, per-file match probe, CDF capture), so
  * the idiomatic seam is a post-hoc resolution rule — registered by
  * `graft.GraftExtensions` — that rewrites a resolved [[UpdateTable]]
  * over a graft-delta relation into a driver command calling it.
  * Everything else (analysis, name resolution, type checking of the
  * assignments) stays Spark's. Tables from other sources are left
  * untouched and keep Spark's "UPDATE not supported" behavior. */
case class SqlUpdateRule(spark: SparkSession) extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperators {
    case u @ UpdateTable(rel, assignments, condition) if u.resolved =>
      rel.collectFirst {
        case r: DataSourceV2Relation if r.table.isInstanceOf[DeltaStreamTable] =>
          r.table.asInstanceOf[DeltaStreamTable]
      } match {
        case None => u // not ours: leave for Spark to handle (or refuse)
        case Some(t) =>
          val set = assignments.map { a =>
            a.key match {
              case attr: AttributeReference =>
                attr.name -> ColumnBridge.column(unresolve(a.value))
              case other => throw new UnsupportedOperationException(
                s"graft-delta: UPDATE of nested field $other is not supported")
            }
          }.toMap
          val cond = condition
            .map(c => ColumnBridge.column(unresolve(c)))
            .getOrElse(org.apache.spark.sql.functions.lit(true))
          GraftUpdateCommand(t.path, set, cond)
      }

    // SQL MERGE, scoped to the CANONICAL upsert the engine's merge
    // implements: ON t.k = s.k, WHEN MATCHED THEN UPDATE SET * /
    // WHEN NOT MATCHED THEN INSERT * (the resolution-expanded forms),
    // no other clauses. Anything else is left for Spark, which refuses
    // it — a silently approximated MERGE would be worse than none.
    case m @ MergeIntoTable(target, source, cond,
        Seq(UpdateAction(None, updAssigns, _)),
        Seq(InsertAction(None, insAssigns)),
        Seq(), false) if m.resolved =>
      target.collectFirst {
        case r: DataSourceV2Relation if r.table.isInstanceOf[DeltaStreamTable] =>
          (r.table.asInstanceOf[DeltaStreamTable], r)
      } match {
        case None => m
        case Some((t, rel)) =>
          val targetCols = rel.output.map(_.name)
          val sourceAttrs = source.output
          def isStar(assigns: Seq[Assignment]): Boolean =
            assigns.size == targetCols.size && assigns.forall {
              case Assignment(k: AttributeReference, v: AttributeReference) =>
                k.name == v.name && sourceAttrs.exists(_.exprId == v.exprId)
              case _ => false
            }
          val key = cond match {
            case EqualTo(a: AttributeReference, b: AttributeReference)
                if a.name == b.name => Some(a.name)
            case _ => None
          }
          if (key.isEmpty || !isStar(updAssigns) || !isStar(insAssigns)) m
          else GraftMergeCommand(t.path, source, targetCols, key.get)
      }
  }

  /** The analyzed expressions carry THIS plan's attribute ids;
    * [[DeltaTable.update]] re-resolves by NAME against its own scan, so
    * strip references back to unresolved names. */
  private def unresolve(e: Expression): Expression = e.transform {
    case a: AttributeReference => UnresolvedAttribute.quoted(a.name)
  }
}

/** Driver command executing the engine's row-level UPDATE. */
case class GraftUpdateCommand(path: String, set: Map[String, Column],
                              cond: Column) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    DeltaTable.update(spark, path, cond, set)
    Seq.empty
  }
}

/** Driver command executing the engine's MERGE (upsert by key) with the
  * resolved SOURCE sub-plan as the updates relation, columns reordered
  * to the target's order (the engine enforces schema equality). */
case class GraftMergeCommand(path: String, source: LogicalPlan,
                             targetCols: Seq[String], keyCol: String)
    extends LeafRunnableCommand {
  override def innerChildren: Seq[LogicalPlan] = Seq(source)
  override def run(spark: SparkSession): Seq[Row] = {
    import org.apache.spark.sql.functions.col
    val updates = ColumnBridge.ofRows(spark, source)
      .select(targetCols.map(col): _*)
    DeltaTable.merge(updates, path, keyCol)
    Seq.empty
  }
}
