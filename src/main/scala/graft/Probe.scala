package graft

/** Args-driven per-query timing probe — the adjudication tool for bench
  * variance: `graft.Bench` measures every declared query once per run,
  * so a single slow-window row (hypervisor stall, page-cache miss) is
  * indistinguishable from a regression in its output. This main re-runs
  * a NAMED subset several times back-to-back on a warm session, which is
  * exactly the evidence the bench-record adjudication needs (steady-state
  * per-query numbers, not one-shot totals).
  *
  * Usage: `sbt "runMain graft.Probe [-n ITERS] q_foo q_bar ..."`
  * SF dir from `SPARK_GRAFT_SF_DIR` (default `/root/testdata/sf0.1`);
  * each query runs through the noop sink (full computation, no collect),
  * with one un-timed warmup query first to absorb session start-up. */
object Probe {
  def main(args: Array[String]): Unit = {
    val (iters, names) = args.toList match {
      case "-n" :: n :: rest => (n.toInt, rest)
      case rest => (3, rest)
    }
    require(names.nonEmpty, "usage: graft.Probe [-n ITERS] q_name ...")
    val unknown = names.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")
    val spark = Sessions.local("probe")
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def run(q: String, print: Boolean): Unit = {
      val t0 = System.nanoTime()
      SparkEntry.queries(q)(spark, dir).write.mode("overwrite").format("noop").save()
      if (print) println(f"$q: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    run(names.head, print = false) // warm the session off the books
    for (i <- 1 to iters; q <- names) run(q, print = true)
    spark.stop()
  }
}
