package graft.sources

import java.nio.file.{Files, Paths, StandardCopyOption}

/** Remote-file transport seam for the reference's SFTP source/sink
  * (/root/reference/spark.json:15 `dataSource: sftp`, spark.json:83-87
  * sftp sink). The reference's engine pulls remote files to staging before
  * reading and pushes written files after (SURVEY.md S11/W9); this trait
  * isolates the transport so the offline build stays testable: the
  * local-filesystem implementation is real and exercised, the SFTP one is
  * a compile-time-present stub that names exactly what a deployment wires
  * in (an SSH client), per SURVEY.md §7.4. */
trait RemoteFs {
  /** Fetch `remotePath` (file or directory) into `localDir`; returns the
    * local path to hand to a file reader. */
  def download(remotePath: String, localDir: String): String

  /** Push a local file or directory to `remoteDir`. */
  def upload(localPath: String, remoteDir: String): Unit
}

/** Local staging implementation — also the test double for SFTP flows. */
class LocalStagingFs extends RemoteFs {
  private def copyTree(src: java.nio.file.Path, dest: java.nio.file.Path): Unit =
    graft.util.Fs.walk(src).foreach { p =>
      val t = dest.resolve(src.relativize(p).toString)
      if (Files.isDirectory(p)) Files.createDirectories(t)
      else {
        Files.createDirectories(t.getParent)
        Files.copy(p, t, StandardCopyOption.REPLACE_EXISTING)
      }
    }

  override def download(remotePath: String, localDir: String): String = {
    val src = Paths.get(remotePath)
    val dest = Paths.get(localDir, src.getFileName.toString)
    if (Files.isDirectory(src)) copyTree(src, dest)
    else {
      Files.createDirectories(dest.getParent)
      Files.copy(src, dest, StandardCopyOption.REPLACE_EXISTING)
    }
    dest.toString
  }

  override def upload(localPath: String, remoteDir: String): Unit = {
    val src = Paths.get(localPath)
    Files.createDirectories(Paths.get(remoteDir))
    val dest = Paths.get(remoteDir, src.getFileName.toString)
    if (Files.isDirectory(src)) copyTree(src, dest)
    else Files.copy(src, dest, StandardCopyOption.REPLACE_EXISTING)
  }
}

/** Deployment seam: SFTP transport needs an SSH client library (e.g. JSch
  * or sshj), unavailable in this zero-egress build. */
class SftpFs(host: String, port: Int, user: String) extends RemoteFs {
  private def unsupported = throw new UnsupportedOperationException(
    s"SFTP transport to $user@$host:$port requires an SSH client library; " +
      "wire JSch/sshj into SftpFs for deployment (offline build ships the seam only)")
  override def download(remotePath: String, localDir: String): String = unsupported
  override def upload(localPath: String, remoteDir: String): Unit = unsupported
}
