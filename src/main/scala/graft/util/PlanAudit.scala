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

  /** Repeated-subtree detector for the multiply-consumed-unstaged-frame
    * defect class: a plan fragment containing SHUFFLE work (aggregate,
    * join, window, distinct, repartition, global sort) that appears under
    * two or more parents with no materialization (localCheckpoint /
    * cache / staged parquet) between — each consumer re-runs the
    * producing pipeline, and at 100 TB the recompute multiplies the
    * dominant pass per consumer. Rounds 8 and 9 each re-introduced this
    * class by hand; this audit makes it mechanical
    * (`PlanHygieneSpec` runs it over every registry query).
    *
    * Detection runs on the ANALYZED plan, not the optimized one: after
    * optimization each consumer prunes and pushes into its copy of the
    * shared fragment differently, so the duplicates are no longer
    * canonically equal (exactly why Spark's exchange reuse does not
    * rescue them either). In the analyzed plan the shared Dataset
    * subtree appears verbatim under every consumer. Staged frames are
    * LogicalRDD/InMemoryRelation leaves by the time the plan is built,
    * so a staged self-join (the pair-join operators) does NOT flag —
    * only genuinely re-evaluated shuffle pipelines do. Repeated
    * shuffle-FREE fragments (a scan + explode read twice) are
    * deliberately not findings: re-running a narrow pass is routinely
    * cheaper than materializing it.
    *
    * Reported fragments are MAXIMAL: the walk stops at the highest
    * repeated node, so one shared pipeline yields one finding, not one
    * per operator inside it. Subquery-expression plans (scalar/EXISTS
    * subqueries) are not walked — they are Spark-managed, deduplicated
    * by the optimizer's CTE/subquery machinery. */
  def repeatedSubtrees(df: DataFrame): Seq[Finding] = {
    import org.apache.spark.sql.catalyst.plans.logical._
    val plan = df.queryExecution.analyzed
    def isShuffleNode(p: LogicalPlan): Boolean = p match {
      case _: Aggregate | _: Join | _: Window | _: Distinct | _: Deduplicate |
           _: RepartitionByExpression | _: Repartition |
           _: Intersect | _: Except => true
      case s: Sort => s.global
      case _ => false
    }
    def hasShuffleWork(p: LogicalPlan): Boolean =
      p.collectFirst { case n if isShuffleNode(n) => n }.isDefined
    // Count occurrences by canonicalized form — but canonicalization
    // COLLAPSES no-op operators (an identity or rename-only Project
    // canonicalizes equal to its child), so a parent-child chain with one
    // canonical form is ONE computation, not two consumers: count only
    // the top of each equal-canonical chain.
    val counts = scala.collection.mutable.HashMap
      .empty[LogicalPlan, Int].withDefaultValue(0)
    def countAll(p: LogicalPlan, parentCanon: LogicalPlan): Unit = {
      val c = p.canonicalized
      if (c != parentCanon) counts(c) += 1
      p.children.foreach(countAll(_, c))
    }
    countAll(plan, null)
    // a repeat ROOTED at a view / named-subquery alias is, at the alias
    // level, a source re-reference (s.table twice, a temp view or SQL
    // subquery alias referenced twice) — re-naming is not the defect, so
    // the alias node itself is never reported. But the walk must still
    // DESCEND into it: a view/subquery BODY that contains shuffle work is
    // re-expanded verbatim per reference in the analyzed plan (views are
    // not CTEs — there is no WithCTE materialization rescuing them, and
    // after optimization the copies diverge past exchange reuse), so a
    // repeated shuffle pipeline hiding inside a twice-referenced alias is
    // exactly the re-evaluation defect this audit exists for. (True SQL
    // `WITH` CTEs analyze to WithCTE + CTERelationRef, not duplicated
    // subtrees, so Catalyst's CTE machinery owns those either way.)
    def isAliasRoot(p: LogicalPlan): Boolean = p match {
      case _: SubqueryAlias | _: View => true
      case _ => false
    }
    def describe(p: LogicalPlan, c: Int): String = {
      val shuffles = p.collect { case n if isShuffleNode(n) => n.nodeName }
      val leaves = p.collectLeaves().map(_.nodeName).distinct
      s"$c consumers re-evaluate an unstaged ${p.nodeName} fragment " +
        s"[shuffle nodes: ${shuffles.groupBy(identity).map { case (k, v) =>
          s"$k x${v.size}" }.toSeq.sorted.mkString(", ")}; " +
        s"leaves: ${leaves.mkString(", ")}]; stage it " +
        "(Staging.stage / localCheckpoint) so the producing pipeline runs once"
    }
    val reported = scala.collection.mutable.HashSet.empty[LogicalPlan]
    val out = scala.collection.mutable.ArrayBuffer.empty[Finding]
    def visit(p: LogicalPlan): Unit = {
      val c = counts(p.canonicalized)
      if (c >= 2 && !isAliasRoot(p)) {
        // maximal repeated fragment: children repeat with it — don't descend
        if (hasShuffleWork(p) && !reported(p.canonicalized)) {
          reported += p.canonicalized
          out += Finding("warn", "RepeatedSubtree", describe(p, c))
        }
      } else p.children.foreach(visit)
    }
    visit(plan)
    out.toSeq
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
