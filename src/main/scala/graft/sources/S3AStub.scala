package graft.sources

import java.io.File
import java.net.URI
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, Path, RawLocalFileSystem}
import org.apache.spark.sql.SparkSession

/** Local object-store stub for the `s3a://` scheme.
  *
  * The reference declares `dataSource: aws-s3` and s3 temp/sink paths
  * (/root/reference/spark.json:9,15); in production the engine reaches S3
  * through the standard hadoop-aws `S3AFileSystem`, configured purely via
  * `fs.s3a.impl` + credentials in the conf passthrough (O6) — no engine
  * code changes. This offline container has no hadoop-aws jar and no
  * network, so the build exercises the SAME wiring — URI scheme → impl
  * class resolution, bucket-as-authority addressing, multi-bucket FS
  * caching, qualified-path round trips through scans and writes — against
  * a filesystem whose "buckets" live under a local root directory:
  *
  *   s3a://bucket/key/parts  ⇌  <fs.s3a.stub.root>/bucket/key/parts
  *
  * Every Spark read/write then flows through this FileSystem exactly as it
  * would through the real S3A connector (open/create/list/rename via the
  * FileSystem API), which is what makes an `s3a://` integration test
  * honest rather than a string match on the scheme. */
class S3AStubFileSystem extends RawLocalFileSystem {

  private var stubUri: URI = _

  override def initialize(name: URI, conf: Configuration): Unit = {
    stubUri = URI.create(s"${name.getScheme}://${name.getAuthority}")
    super.initialize(name, conf)
  }

  override def getScheme: String = "s3a"
  override def getUri: URI =
    // the superclass constructor qualifies its working dir through getUri
    // before initialize() has run
    if (stubUri == null) super.getUri else stubUri
  override def getWorkingDirectory: Path =
    // the superclass constructor probes this before initialize() runs
    if (stubUri == null) super.getWorkingDirectory
    else new Path(stubUri.toString + "/")

  private def rootDir: String = {
    val r = getConf.get("fs.s3a.stub.root")
    require(r != null, "fs.s3a.stub.root must point at the local stub root")
    r.stripSuffix("/")
  }

  /** s3a://bucket/key → <root>/bucket/key (idempotent for already-mapped
    * local paths, so FileStatus round trips can't double-map). */
  override def pathToFile(path: Path): File = {
    checkPath(path)
    val u = path.toUri
    val p = if (u.getPath == null || u.getPath.isEmpty) "/" else u.getPath
    if (p.startsWith(rootDir + "/")) new File(p)
    else {
      val bucket = Option(u.getAuthority).getOrElse(stubUri.getAuthority)
      new File(s"$rootDir/$bucket$p")
    }
  }

  // statuses from RawLocalFileSystem carry the LOCAL backing path
  // qualified with our s3a URI; remap them to clean bucket-relative s3a
  // paths so listings, partition discovery, and scans never see the root
  private def toS3(p: Path): Path = {
    val pp = p.toUri.getPath
    if (pp != null && pp.startsWith(rootDir + "/")) {
      val rel = pp.substring(rootDir.length + 1) // "bucket/key..."
      val i = rel.indexOf('/')
      if (i < 0) new Path(s"s3a://$rel/") else new Path(s"s3a://$rel")
    } else p
  }

  // a fresh status, not a path-mutated one: the superclass's lazy
  // permission loader re-derives a java.io.File from the status path and
  // would choke on the s3a URI. Null permission/owner/group fall back to
  // defaults without IO — matching real object stores, which have no
  // POSIX permissions either.
  private def clean(st: FileStatus): FileStatus =
    new FileStatus(st.getLen, st.isDirectory, st.getReplication, st.getBlockSize,
      st.getModificationTime, st.getAccessTime, null, null, null, toS3(st.getPath))

  override def getFileStatus(f: Path): FileStatus = clean(super.getFileStatus(f))
  override def listStatus(f: Path): Array[FileStatus] = super.listStatus(f).map(clean)
}

object S3AStub {
  /** Opt-in flag: route `s3a://` through the local stub, buckets rooted at
    * `root`. Production deployments instead set `fs.s3a.impl` to the real
    * hadoop-aws connector through the same conf surface. */
  def enable(spark: SparkSession, root: String): Unit = {
    val hc = spark.sparkContext.hadoopConfiguration
    hc.set("fs.s3a.impl", classOf[S3AStubFileSystem].getName)
    hc.set("fs.s3a.stub.root", root)
    // conf changes must reach new FS instances, not a cached pre-flag one
    hc.set("fs.s3a.impl.disable.cache", "true")
  }
}
