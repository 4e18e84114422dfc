package graft

/** GRAFT_TIMING=1 per-step wall-clock prints — the local stand-in for
  * the per-job metrics a cluster deployment reads off the Spark UI /
  * event log. One shared format so table-layer and materializer lines
  * interleave legibly in a bench log.
  */
object Timing {
  def timed[A](prefix: String, label: String)(body: => A): A =
    if (!sys.env.contains("GRAFT_TIMING")) body
    else {
      val t0 = System.nanoTime()
      val r = body
      println(f"TIMING $prefix/$label%-22s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
}
