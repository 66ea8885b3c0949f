package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys — the portable mitigation when ONE
  * join key carries a disproportionate share of the big side's rows and
  * the shuffle partition holding it becomes the straggler.
  *
  * Mitigation ladder at 100 TB (use the earliest rung that applies):
  *   1. `broadcast(small)` — no shuffle at all; first choice when the
  *      small side fits an executor.
  *   2. AQE skew-join splitting (`spark.sql.adaptive.skewJoin.enabled`) —
  *      runtime re-plan, no code change; handles moderate skew.
  *   3. THIS operator — explicit salting for the pathological tail AQE's
  *      thresholds won't catch (one key = 30% of a 100 TB fact table), or
  *      on engines/pipelines where AQE is off. Pick R from
  *      [[graft.x.Profiler.keySkew]]'s `skew_ratio`.
  *
  * Mechanics: each big-side row gets a DETERMINISTIC salt in [0, R)
  * (caller supplies the hash expression — determinism keeps retries and
  * oracle replays exact); the small side is replicated R× with a literal
  * salt column, and the join runs on (keys..., salt). A hot key's rows
  * now spread over R shuffle partitions instead of one. The result set is
  * IDENTICAL to the unsalted join — each big row matches exactly the
  * replica carrying its salt — which the x133 oracle verifies row-for-row
  * against a plain SQL join. Cost: small side shuffles R× its size (still
  * tiny by precondition); big side cost unchanged. */
object SkewJoin {

  /** Inner equi-join of `big` and `small` on `keys`, salted `r` ways.
    * `bigSalt` must be a deterministic non-negative expression over big's
    * columns (e.g. `pmod(PolyHash56(concat(idCols)), lit(r))` — pass the
    * UNmodded hash; this applies the mod). */
  def saltedInnerJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
      r: Int, bigSalt: Column): DataFrame = {
    require(r >= 2 && r <= 1024, s"salt factor $r outside [2,1024]")
    require(keys.nonEmpty, "saltedInnerJoin needs join keys")
    val salted = big.withColumn("__salt", pmod(bigSalt, lit(r.toLong)))
    val replicated = small.withColumn("__salt",
      explode(array((0 until r).map(i => lit(i.toLong)): _*)))
    salted.join(replicated, keys :+ "__salt").drop("__salt")
  }
}
