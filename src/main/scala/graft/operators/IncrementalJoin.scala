package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental equi-join maintenance (the delta rule for joins) — the
  * join sibling of [[IncrementalAgg]]'s aggregate refresh.
  *
  * The reference's pipelines re-run their join transformations from the
  * full sources every scheduled run (/root/reference/deploy.yaml:13). For
  * an APPEND-ONLY join view `R = A ⋈ B`, the rows a refresh adds are
  * exactly the classic incremental-view-maintenance delta
  * (Blakeley et al. 1986; Griffin & Libkin 1995):
  *
  *   ΔR  =  ΔA ⋈ B_old  ∪  A_old ⋈ ΔB  ∪  ΔA ⋈ ΔB
  *       =  ΔA ⋈ (B_old ∪ ΔB)  ∪  A_old ⋈ ΔB
  *
  * (the factored form evaluates ΔA⋈ΔB once, not twice). Appending ΔR to
  * the stored view gives a bag-identical result to the full recompute —
  * proved bag-algebraically by `(A∪ΔA)⋈(B∪ΔB)` distributing over union.
  *
  * Scale shape at 100 TB: the deltas are a day's sliver of each table, so
  * BOTH joins put the delta on the build side — broadcast when it fits
  * (the hint below lets AQE decide from actual delta size), shuffled-hash
  * otherwise — and the two big stored tables are each SCANNED ONCE and
  * never joined against each other. A full recompute joins |A|+|ΔA|
  * against |B|+|ΔB|; the delta refresh's shuffle is O(|ΔA| + |ΔB|) plus
  * two big-table scans that prune to the join keys' partitions when the
  * stored tables are bucketed/partitioned on them. Deletes/updates need
  * retraction bookkeeping (the join of a retraction is a retraction) —
  * out of scope here; route changed keys through [[Upsert]] semantics or
  * a partition-scoped rewrite ([[Scd2]]) instead.
  */
object IncrementalJoin {

  /** New view rows for append-only deltas of an inner equi-join.
    * `aOld`/`aDelta` share A's schema, `bOld`/`bDelta` share B's; the
    * output schema is A's columns then B's (minus `bKey`, which equals
    * `aKey` on every row). The caller appends the result to the stored
    * view. Delta sides carry a broadcast hint: correct when deltas are
    * slivers, and AQE demotes it gracefully if a backfill-sized delta
    * arrives. */
  def deltaJoinAppend(aOld: DataFrame, aDelta: DataFrame,
      bOld: DataFrame, bDelta: DataFrame,
      aKey: String, bKey: String): DataFrame = {
    val bAll = bOld.unionByName(bDelta)
    val cond: (DataFrame, DataFrame) => Column = (a, b) => a(aKey) === b(bKey)
    val part1 = broadcast(aDelta).join(bAll, cond(aDelta, bAll))
    val part2 = aOld.join(broadcast(bDelta), cond(aOld, bDelta))
    part1.unionByName(part2).drop(bKey)
  }
}
