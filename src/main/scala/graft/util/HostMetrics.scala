package graft.util

/** Host-contention metrics shared by the timing tools ([[graft.Bench]],
  * [[graft.tools.TimeQueries]]) — one implementation so the bench's
  * recorded tags and the adjudication tool's re-timings can never
  * silently diverge on how steal is parsed. */
object HostMetrics {
  private val osBean =
    java.lang.management.ManagementFactory.getOperatingSystemMXBean

  /** 1-minute load average at call time; -1.0 if unavailable. Inside a
    * guest VM this counts ONLY our own runnable threads — see
    * [[stealSec]] for the channel that sees the host. */
  def loadAvg(): Double = {
    val la = osBean.getSystemLoadAverage
    if (la.isNaN) -1.0 else math.round(la * 100) / 100.0
  }

  /** Cumulative hypervisor STEAL time in seconds (/proc/stat field 8,
    * USER_HZ = 100 jiffies/s). A co-tenant on the HOST is invisible to
    * the load average but shows up here: CPU-seconds the host took from
    * us while we were runnable. The per-interval DELTA is the direct,
    * quantitative contamination tag (r10's 404 s vs 259 s bench
    * adjudication). -1.0 when the kernel doesn't expose it. */
  def stealSec(): Double = {
    try {
      val src = scala.io.Source.fromFile("/proc/stat")
      val line = try src.getLines().next() finally src.close()
      val f = line.trim.split("\\s+")
      if (f.length > 8) f(8).toDouble / 100.0 else -1.0
    } catch { case _: Throwable => -1.0 }
  }
}
