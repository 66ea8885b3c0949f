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
