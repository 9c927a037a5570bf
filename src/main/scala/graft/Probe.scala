package graft

// scratch probe — delete before commit
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("probe")
    spark.sparkContext.setLogLevel("ERROR")
    def run(q: String, dir: String): Unit = {
      val t0 = System.nanoTime()
      SparkEntry.queries(q)(spark, dir).write.mode("overwrite").format("noop").save()
      println(f"$q@$dir: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    run("q_knn", "/root/testdata/sf0.01") // warm
    for (d <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1");
         _ <- 1 to 3) run("q_margin_mine", d)
    spark.stop()
  }
}
