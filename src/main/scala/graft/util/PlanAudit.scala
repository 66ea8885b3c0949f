package graft.util

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SortExec

/** Pre-flight physical-plan linter: the mistakes that are invisible at
  * test scale and fatal at 100 TB, caught BEFORE execution.
  *
  * A config-driven pipeline (the reference's phase_2 accepts arbitrary
  * SQL, /root/reference/spark.json:54-65) will eventually receive a join
  * whose predicate got typo'd away. At 60k rows that runs in seconds and
  * ships; at 100 TB the cartesian product is a cluster-week. The linter
  * walks the compiled physical plan — no execution, no sampling — and
  * reports:
  *
  *  - `error` CartesianProduct: an unconditioned join of two unbounded
  *    sides produces |L|·|R| rows. Never survivable at scale.
  *  - `warn` BroadcastNestedLoopJoin: a non-equi or degenerate join that
  *    evaluates its predicate against every broadcast row per input row.
  *    Legitimate for a genuinely tiny side (the theta-join operators
  *    here use it deliberately), lethal when the "small" side isn't.
  *  - `info` global Sort: a full range exchange — expected as a final
  *    ORDER BY for presentation, a smell in the middle of a pipeline
  *    (windows and top-k don't need it).
  *
  * Severity stays a judgment call for the caller: [[audit]] returns the
  * findings; [[assertSafe]] throws on errors (the orchestrator prints
  * warnings per transformation and lets `strictPlanAudit` escalate). */
object PlanAudit {

  final case class Finding(severity: String, node: String, detail: String)

  def audit(df: DataFrame): Seq[Finding] = {
    val findings = scala.collection.mutable.ArrayBuffer[Finding]()
    df.queryExecution.sparkPlan.foreach {
      case p if p.nodeName == "CartesianProduct" =>
        findings += Finding("error", "CartesianProduct",
          "unconditioned cross join: output is |left| x |right| rows; " +
            "add an equi-join key or an explicit crossJoin on a bounded side")
      case p if p.nodeName == "BroadcastNestedLoopJoin" =>
        findings += Finding("warn", "BroadcastNestedLoopJoin",
          "non-equi join evaluates its predicate per (row, broadcast-row) " +
            "pair; safe only when the broadcast side is genuinely small")
      case s: SortExec if s.global =>
        findings += Finding("info", "GlobalSort",
          "full range exchange; expected for a final ORDER BY, " +
            "a smell mid-pipeline")
      case _ => ()
    }
    findings.toSeq
  }

  /** Throw on `error` findings (and on `warn` when `allowWarnings` is
    * false); returns the findings otherwise so callers can log them. */
  def assertSafe(df: DataFrame, allowWarnings: Boolean = true): Seq[Finding] = {
    val fs = audit(df)
    val fatal = fs.filter(f =>
      f.severity == "error" || (!allowWarnings && f.severity == "warn"))
    if (fatal.nonEmpty)
      sys.error("plan audit failed:\n" + fatal.map(f =>
        s"  [${f.severity}] ${f.node}: ${f.detail}").mkString("\n"))
    fs
  }
}
