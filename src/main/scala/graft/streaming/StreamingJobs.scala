package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.config.SinkSpec
import graft.sinks.SinkWriter

/** Streaming extension (SURVEY.md §2.8, mandated by the north star — the
  * reference itself is batch-only, deploy.yaml:13 schedules reruns). Design:
  * the same job model with streaming sources; transformations are unchanged
  * because Spark SQL is shared between batch and streaming plans; sinks
  * reuse the batch writers through `foreachBatch` — which is also the only
  * way to run the SCD2 merge per micro-batch (stateful merge is not
  * expressible in pure streaming SQL; SURVEY.md §7.4).
  *
  * Scale notes: every aggregation here carries a watermark so state is
  * bounded (unbounded state is the way streaming jobs die at scale);
  * dedupWithinWatermark keeps only the key+timestamp in state, not rows.
  */
object StreamingJobs {

  /** File-stream source over a parquet directory (the fixtures' `events`
    * table replayed as a stream; schema must be provided in streaming). */
  def fileStream(spark: SparkSession, path: String, schema: StructType,
      format: String = "parquet", maxFilesPerTrigger: Int = 1): DataFrame =
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .format(format)
      .load(path)

  /** Tumbling/sliding window aggregation with watermarked late-data bound.
    * slide == window ⇒ tumbling. */
  def windowedCounts(events: DataFrame, tsCol: String, windowDur: String,
      slideDur: Option[String] = None, watermark: String = "10 minutes",
      groupCols: Seq[String] = Seq("event_type")): DataFrame = {
    val win = slideDur match {
      case Some(s) => window(col(tsCol), windowDur, s)
      case None    => window(col(tsCol), windowDur)
    }
    events
      .withWatermark(tsCol, watermark)
      .groupBy(win +: groupCols.map(col): _*)
      // decimal-cast sum: exact & order-independent, so batch, streaming,
      // and the DuckDB oracle all agree bit-for-bit
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
      .select(Seq(col("window.start").as("window_start"),
        col("window.end").as("window_end")) ++ groupCols.map(col) ++
        Seq(col("n"), col("total_value")): _*)
  }

  /** Session windows: activity grouped by gaps ≥ `gap` per user. */
  def sessionized(events: DataFrame, tsCol: String, userCol: String,
      gap: String = "5 minutes", watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(session_window(col(tsCol), gap), col(userCol))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("session_value"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col(userCol), col("n_events"), col("session_value"))

  /** Streaming dedup with bounded state. */
  def dedupWithinWatermark(events: DataFrame, tsCol: String, keys: Seq[String],
      watermark: String = "10 minutes"): DataFrame =
    events.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keys)

  /** Run any transformed stream into the batch sink machinery per
    * micro-batch — this is how scdType2Insert works in streaming mode. */
  def startForeachBatch(stream: DataFrame, sink: SinkSpec,
      checkpoint: String, trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        SinkWriter.write(batch.sparkSession, batch, sink)
      }
      .start()
}
