package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.VersionedParquet

/** Key-based upsert (MERGE) into a versioned table: staged rows replace
  * current rows with the same business key, brand-new keys insert, and
  * untouched keys carry forward — the "latest version wins" load type
  * (Delta's `MERGE WHEN MATCHED UPDATE WHEN NOT MATCHED INSERT`), the
  * most common load pattern after plain appends when history is NOT
  * wanted (SCD2 is the history-keeping sibling, SURVEY.md §7.3).
  *
  * Implementation is an anti-join + union: current rows whose key does
  * not appear in the batch survive, the batch inserts wholesale. The
  * batch side is the small one, so its distinct keys broadcast and the
  * current table is touched map-side only; the result commits as one
  * new version (snapshot isolation + time travel for free).
  *
  * At 100 TB the anti-join rewrites the whole table into the new
  * commit; partition the dimension by a stable key bucket and scope the
  * rewrite to touched partitions — the same evolution documented for
  * SCD2 in SURVEY.md §4 — before reaching for this on fact-sized data
  * (where [[IncrementalAgg]] or plain appends are the right tool).
  *
  * Duplicate keys WITHIN the batch are the caller's contract to resolve
  * first ([[Validations.dedup]]); this operator inserts the batch as
  * given. Re-running the same batch converges to the same table
  * (replaced rows are replaced with identical content), so retries are
  * safe at the table level. */
object Upsert {

  def upsert(spark: SparkSession, batch: DataFrame, path: String,
      keyCols: Seq[String]): Unit = {
    require(keyCols.nonEmpty, "upsert needs business keys")
    val next =
      if (VersionedParquet.versions(path).isEmpty) batch
      else {
        val current = VersionedParquet.read(spark, path)
        val keys = batch.select(keyCols.map(col): _*).distinct()
        current.join(broadcast(keys), keyCols, "left_anti").unionByName(batch)
      }
    VersionedParquet.write(next, path, "overwrite")
  }
}
