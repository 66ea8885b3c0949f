package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.config.{InputSpec, SinkSpec}
import graft.sinks.SinkWriter
import graft.sources.{LocalStagingFs, SftpFs, SourceReader}
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

class SourcesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("text source reads one string column per line (S8)") {
    val dir = Files.createTempDirectory("graft-text").toString
    Files.writeString(Paths.get(s"$dir/lines.txt"), "alpha\nbeta\ngamma\n")
    val df = SourceReader.read(spark, InputSpec("lines", "text", Some(dir)))
    assert(df.columns.toSeq == Seq("value"))
    assert(df.as[String].collect().sorted.toSeq == Seq("alpha", "beta", "gamma"))
  }

  test("headerless csv source names columns positionally (S2)") {
    val dir = Files.createTempDirectory("graft-csvnh").toString
    Files.writeString(Paths.get(s"$dir/d.csv"), "1,x\n2,y\n")
    val df = SourceReader.read(spark, InputSpec("nh", "csv", Some(dir), header = false,
      options = Map("header" -> "false")))
    assert(df.count() == 2 && df.columns.length == 2)
  }

  test("s3a:// round trip through sink and source layers (aws-s3 dataSource)") {
    // local object-store stub behind the fs.s3a.impl flag — the same conf
    // surface a production deployment points at the real hadoop-aws
    // connector; everything below it is genuine FileSystem-API traffic
    val root = Files.createTempDirectory("graft-s3stub").toString
    graft.sources.S3AStub.enable(spark, root)
    val df = spark.read.parquet(s"${TestSpark.sfDir}/nation.parquet")
      .select($"n_nationkey", $"n_name", $"n_regionkey")
    SinkWriter.write(spark, df, SinkSpec("nation", "simpleInsert", "parquet",
      Some("s3a://graft-test-bucket/warehouse/nation"), savemode = "overwrite"))
    // the bucket materialized under the stub root — the write really went
    // through the s3a scheme, not a silently-local path
    assert(Files.exists(Paths.get(s"$root/graft-test-bucket/warehouse/nation")))
    val back = SourceReader.read(spark, InputSpec("nation_s3", "parquet",
      Some("s3a://graft-test-bucket/warehouse/nation")))
    assert(back.count() == 25)
    assert(back.exceptAll(df).isEmpty && df.exceptAll(back).isEmpty)
    // append lands a second batch in the same bucket path
    SinkWriter.write(spark, df, SinkSpec("nation", "simpleInsert", "parquet",
      Some("s3a://graft-test-bucket/warehouse/nation"), savemode = "append"))
    assert(spark.read.parquet("s3a://graft-test-bucket/warehouse/nation").count() == 50)
  }

  test("sftp source stages through RemoteFs then reads (S11)") {
    val remote = Files.createTempDirectory("graft-remote").toString
    Files.writeString(Paths.get(s"$remote/feed.csv"), "id,v\n1,a\n2,b\n3,c\n")
    val df = SourceReader.read(spark, InputSpec("feed", "sftp",
      Some(s"$remote/feed.csv"), options = Map("stagedFormat" -> "csv")))
    assert(df.count() == 3)
    assert(df.columns.toSeq == Seq("id", "v"))
    assert(spark.sql("SELECT COUNT(*) FROM feed").head().getLong(0) == 3)
  }

  test("sftp sink uploads written output through RemoteFs (W9)") {
    val out = Files.createTempDirectory("graft-sftpout").toString + "/report"
    val remote = Files.createTempDirectory("graft-remote-up").toString
    SinkWriter.write(spark, Seq((1, "a"), (2, "b")).toDF("id", "v"),
      SinkSpec("report", format = "csv", path = Some(out), singleFile = true,
        outputFileNamePrefix = Some("daily"),
        options = Map("header" -> "true", "remoteDirPath" -> remote)))
    val uploaded = Files.walk(Paths.get(remote)).iterator().asScala
      .filter(Files.isRegularFile(_)).toList
    assert(uploaded.exists(_.getFileName.toString.startsWith("daily_")))
  }

  test("the SFTP transport itself is an explicit deployment seam") {
    val e = intercept[UnsupportedOperationException] {
      new SftpFs("host", 22, "etl").download("/remote/x.csv", "/tmp")
    }
    assert(e.getMessage.contains("SSH client"))
  }
}
