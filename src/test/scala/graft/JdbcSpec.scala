package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.config.{InputSpec, SinkSpec}
import graft.sinks.SinkWriter
import graft.sources.SourceReader
import java.nio.file.Files

/** S10 database source / W7 database sink (spark.json:15,34-37,71,74)
  * exercised against embedded Derby — the same `spark.read/write.jdbc`
  * path a warehouse target would use, minus the network. */
class JdbcSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  lazy val url: String = {
    val dir = Files.createTempDirectory("graft-derby").toString
    s"jdbc:derby:$dir/db;create=true"
  }

  test("jdbc sink writes and jdbc source reads a table back") {
    val df = Seq((1L, "alpha", 10.5), (2L, "beta", 20.25), (3L, "gamma", -3.0))
      .toDF("id", "name", "bal")
    SinkWriter.write(spark, df, SinkSpec("t", format = "jdbc",
      jdbcUrl = Some(url), tableName = Some("accounts"), savemode = "overwrite"))

    val back = SourceReader.read(spark, InputSpec("accounts_v", format = "jdbc",
      jdbcUrl = Some(url), tableName = Some("accounts")))
    assert(back.count() == 3)
    assert(back.columns.map(_.toLowerCase).toSet == Set("id", "name", "bal"))

    // query-shaped source (tableQuery, spark.json:36): pushdown of a filter
    val q = SourceReader.read(spark, InputSpec("rich_v", format = "jdbc",
      jdbcUrl = Some(url), // Spark writes quoted lowercase identifiers; Derby needs them quoted back
      tableQuery = Some("""SELECT "id", "bal" FROM accounts WHERE "bal" > 0""")))
    assert(q.count() == 2)
    assert(q.columns.map(_.toLowerCase).toSet == Set("id", "bal"))
    // the registered temp view is queryable via SQL (phase-1 contract)
    assert(spark.sql("SELECT COUNT(*) FROM rich_v").head().getLong(0) == 2)
  }

  test("partitioned jdbc read splits into parallel range queries") {
    val big = spark.range(0, 1000).selectExpr("id", "CAST(id % 7 AS DOUBLE) AS bal")
    SinkWriter.write(spark, big, SinkSpec("t", format = "jdbc",
      jdbcUrl = Some(url), tableName = Some("big_tab"), savemode = "overwrite"))
    // the reader option passthrough carries Spark's partitioned-read
    // contract (partitionColumn/bounds/numPartitions) — at warehouse scale
    // this is the difference between one connection streaming the table
    // and N executors each pulling a range
    val back = SourceReader.read(spark, InputSpec("big_v", format = "jdbc",
      jdbcUrl = Some(url), tableName = Some("big_tab"),
      options = Map("partitionColumn" -> "id", "lowerBound" -> "0",
        "upperBound" -> "1000", "numPartitions" -> "4")))
    assert(back.rdd.getNumPartitions == 4, s"got ${back.rdd.getNumPartitions} partitions")
    assert(back.count() == 1000)
    // ranges are disjoint+exhaustive: no dup or dropped ids
    assert(back.select("id").distinct().count() == 1000)
  }

  test("truncateInsert on jdbc replaces contents") {
    val sink = SinkSpec("t", loadType = "truncateInsert", format = "jdbc",
      jdbcUrl = Some(url), tableName = Some("tr_tab"))
    SinkWriter.write(spark, Seq((1L, "old")).toDF("id", "v"), sink)
    SinkWriter.write(spark, Seq((2L, "new"), (3L, "new")).toDF("id", "v"), sink)
    val back = spark.read.format("jdbc").option("url", url)
      .option("dbtable", "tr_tab").load()
    assert(back.count() == 2)
  }
}
