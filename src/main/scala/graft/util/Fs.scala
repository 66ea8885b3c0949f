package graft.util

import java.nio.file.{Files, Path}
import scala.jdk.CollectionConverters._

/** Closed-stream wrappers over `Files.list`/`Files.walk`. The raw NIO
  * streams hold a directory file descriptor until closed; call sites that
  * drop the stream (every `Files.list(...).iterator` pattern) leak one fd
  * per call, which accumulates in long-running pipelines that run SCD2
  * merges or versioned commits repeatedly (ADVICE r1). */
object Fs {
  def list(p: Path): Seq[Path] =
    if (!Files.exists(p)) Nil
    else { val s = Files.list(p); try s.iterator().asScala.toList finally s.close() }

  def walk(p: Path): Seq[Path] =
    if (!Files.exists(p)) Nil
    else { val s = Files.walk(p); try s.iterator().asScala.toList finally s.close() }

  def nonEmptyDir(p: Path): Boolean = list(p).nonEmpty
}
