package graft

import org.scalatest.funsuite.AnyFunSuite

/** Registry-wide staging-discipline gate: every query's analyzed plan runs
  * through [[graft.util.PlanAudit.repeatedSubtrees]], and the findings are
  * diffed against the reviewed baseline (`dev/plan_hygiene_baseline.txt`)
  * — the NAMED exception list PLANS.md's "Plan-hygiene baseline" section
  * justifies class-by-class. The multiply-consumed-unstaged-frame defect
  * (the only recurring driver-bench regression across rounds 8/9) can no
  * longer land silently:
  *
  *  - a NEW repeated shuffle fragment (new query, or an edit that splits a
  *    staged frame back into per-consumer re-evaluation) fails this spec
  *    until it is either staged or reviewed into the baseline;
  *  - a STALE baseline line (a fragment someone fixed) also fails, so the
  *    exception list never outgrows reality — regenerate with
  *    `runMain graft.tools.PlanHygiene /root/testdata/sf0.001`.
  *
  * Why a baseline instead of zero findings: identical repeated fragments
  * are deduplicated by Spark at execution (exchange reuse / AQE stage
  * cache), so most equality-detectable repeats cost one compute at runtime
  * and staging them would ADD a materialization pass (measured: staging
  * the shingle explode in prefixFilterPairs cost +0.5s at sf0.1). The
  * dangerous subclass — consumers that prune or filter the shared frame
  * DIFFERENTLY, defeating exchange reuse — is exactly what a new-vs-
  * baseline diff surfaces when it appears, because it changes the
  * fragment census of the touched query.
  */
class PlanHygieneSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sfDir

  test("repeated-subtree findings match the reviewed baseline") {
    val baselinePath = java.nio.file.Paths.get("dev/plan_hygiene_baseline.txt")
    assert(java.nio.file.Files.exists(baselinePath),
      s"missing $baselinePath — generate with runMain graft.tools.PlanHygiene $sf")
    val baseline = scala.jdk.CollectionConverters.ListHasAsScala(
      java.nio.file.Files.readAllLines(baselinePath)).asScala
      .map(_.trim).filter(l => l.nonEmpty && !l.startsWith("#")).toSet
    val current = graft.tools.PlanHygiene.findings(spark, sf).toSet
    val fresh = (current -- baseline).toSeq.sorted
    val stale = (baseline -- current).toSeq.sorted
    assert(fresh.isEmpty && stale.isEmpty,
      (if (fresh.nonEmpty)
        "\nNEW repeated shuffle fragments (stage the frame with " +
          "Staging.stage/localCheckpoint, or review into the baseline " +
          "via runMain graft.tools.PlanHygiene):\n" +
          fresh.map("  + " + _).mkString("\n")
      else "") +
      (if (stale.nonEmpty)
        "\nSTALE baseline lines (fragment fixed — regenerate the " +
          "baseline so the exception list stays honest):\n" +
          stale.map("  - " + _).mkString("\n")
      else ""))
  }
}
