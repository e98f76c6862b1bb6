package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, CurrentUser, EqualTo, If, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project, SubqueryAlias}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.trees.TreeNodeTag

/** Column-masking policy registry: table/view name → columns to NULL for a
  * restricted user. Backing store for [[MaskPiiRule]]; names and columns
  * compare case-insensitively (Spark's default resolution). */
object MaskingPolicy {
  final case class Policy(cols: Set[String], restrictedUser: String)

  private val policies = scala.collection.concurrent.TrieMap.empty[String, Policy]

  def protect(table: String, cols: Set[String], restrictedUser: String): Unit =
    policies.put(table.toLowerCase, Policy(cols.map(_.toLowerCase), restrictedUser))

  def unprotect(table: String): Unit = policies.remove(table.toLowerCase)

  def get(table: String): Option[Policy] = policies.get(table.toLowerCase)

  /** O(1) pre-check for [[MaskPiiRule]]'s bail-out. */
  def isEmpty: Boolean = policies.isEmpty
}

/** ENGINE-enforced PII masking (ref `init-scripts/init-db.sql:74-89`: the
  * Postgres layer nulls PII columns for the BI role on EVERY read; an
  * opt-in projection like `Ops.maskEmployees` can be forgotten by one
  * caller and leak). Registered through `SparkSessionExtensions`
  * (SURVEY §7.1's Rule[LogicalPlan] option): during analysis, any resolved
  * read of a policy-protected relation gets a masking Project injected
  * above it, so SQL and DataFrame paths are both covered and nothing
  * downstream can reach the raw column.
  *
  * The mask is `IF(current_user() = restricted, NULL, col)` — resolved to
  * a constant by the optimizer's ReplaceCurrentLike + constant folding, so
  * for non-restricted users the plan is byte-identical to the unmasked one
  * (no per-row cost), and column pruning still reaches the scan for
  * untouched columns. A TreeNodeTag marks relations already wrapped so the
  * fixed-point analyzer doesn't stack masks.
  *
  * Matching scope (stated honestly): policies match by NAME — any
  * SubqueryAlias carrying a protected name is masked, including a CTE or
  * derived table that merely shares it (fail-CLOSED: a name collision
  * over-masks rather than risking a protected read slipping through an
  * alias). The converse limit: a direct `spark.read.parquet(path)` of
  * the protected data has no alias at all and bypasses the rule —
  * name-based policies need reads to go through the registered name
  * (view/catalog), the same contract as the reference's Postgres-role
  * masking. */
case class MaskPiiRule(spark: SparkSession) extends Rule[LogicalPlan] {
  import MaskPiiRule.Masked

  override def apply(plan: LogicalPlan): LogicalPlan = {
    // bail-out: with no policies registered (the common analytics
    // session) the rule must not pay a full-tree traversal per analyzer
    // iteration on every query
    if (MaskingPolicy.isEmpty) plan else applyMasks(plan)
  }

  private def applyMasks(plan: LogicalPlan): LogicalPlan = plan.resolveOperatorsUp {
    case s: SubqueryAlias if s.resolved && s.getTagValue(Masked).isEmpty &&
        MaskingPolicy.get(s.identifier.name).isDefined =>
      val policy = MaskingPolicy.get(s.identifier.name).get
      s.setTagValue(Masked, true)
      val out: Seq[NamedExpression] = s.output.map { attr =>
        if (policy.cols.contains(attr.name.toLowerCase))
          // keep the attribute's exprId AND qualifier: operators above
          // were resolved against the alias output, so the masked column
          // must keep its identity (the char-padding-rule trick), and a
          // later-iteration qualified reference (`employees.first_name`)
          // must still resolve against the injected Project
          Alias(
            If(
              EqualTo(CurrentUser(), Literal(policy.restrictedUser)),
              Literal.create(null, attr.dataType),
              attr),
            attr.name)(exprId = attr.exprId, qualifier = attr.qualifier)
        else attr
      }
      Project(out, s)
  }
}

object MaskPiiRule {
  val Masked: TreeNodeTag[Boolean] = TreeNodeTag[Boolean]("graft.pii.masked")
}
