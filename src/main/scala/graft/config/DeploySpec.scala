package graft.config

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.dataformat.yaml.YAMLFactory
import scala.jdk.CollectionConverters._

/** Pipeline deployment spec — the reference's `deploy.yaml` surface
  * (/root/reference/deploy.yaml:1-21): cluster sizing, schedule, spark-submit
  * resources, retries, concurrency. The engine parses and surfaces it
  * (resource knobs feed SparkSession config passthrough, `maximumRetries`
  * feeds the PipelineRunner, `concurrency` bounds parallel step groups);
  * schedule execution itself stays with the caller's scheduler (SURVEY.md
  * §2.6 O3 — out of engine scope by design). */
final case class DeploySpec(
    pipelineName: String,
    scheduleCron: Option[String] = None, // e.g. "0 12 * * 1-5" (deploy.yaml:13)
    schedulePaused: Boolean = false,
    startDate: Option[String] = None,
    concurrency: Int = 4,                // deploy.yaml:11
    maximumRetries: Int = 3,             // deploy.yaml:19
    executorMemory: Option[String] = None, // deploy.yaml:16
    driverMemory: Option[String] = None,   // deploy.yaml:17
    executorCores: Option[Int] = None,     // deploy.yaml:18
    clusterConfig: Map[String, String] = Map.empty // spot/on-demand sizing etc.
) {
  /** spark-submit-shaped resource settings as SparkConf passthrough. */
  def sparkConf: Map[String, String] =
    executorMemory.map("spark.executor.memory" -> _).toMap ++
      driverMemory.map("spark.driver.memory" -> _).toMap ++
      executorCores.map(c => "spark.executor.cores" -> c.toString).toMap
}

object DeploySpec {
  private val mapper = new ObjectMapper(new YAMLFactory())

  def parse(yaml: String): DeploySpec = {
    val root = mapper.readValue(yaml, classOf[java.util.Map[String, Object]])
      .asScala.toMap
    def str(k: String): Option[String] = root.get(k).map(_.toString).filter(_.nonEmpty)
    def int(k: String, dflt: Int): Int = str(k).map(_.toInt).getOrElse(dflt)
    val cluster = root.get("cluster") match {
      case Some(m: java.util.Map[_, _]) =>
        m.asScala.map { case (k, v) => k.toString -> String.valueOf(v) }.toMap
      case _ => Map.empty[String, String]
    }
    DeploySpec(
      pipelineName = str("pipelineName").orElse(str("name")).getOrElse("pipeline"),
      scheduleCron = str("cron").orElse(str("schedule")),
      schedulePaused = str("paused").exists(_.equalsIgnoreCase("true")),
      startDate = str("startDate"),
      concurrency = int("concurrency", 4),
      maximumRetries = int("maximumRetries", 3),
      executorMemory = str("executorMemory"),
      driverMemory = str("driverMemory"),
      executorCores = str("executorCores").map(_.toInt),
      clusterConfig = cluster
    )
  }

  def parseFile(path: String): DeploySpec =
    parse(new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)), "UTF-8"))
}
