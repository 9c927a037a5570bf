package graft

// scratch probe — delete before commit
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("probe")
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def run(q: String): Unit = {
      val t0 = System.nanoTime()
      SparkEntry.queries(q)(spark, dir).write.mode("overwrite").format("noop").save()
      println(f"$q: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    run("q_knn") // warm
    for (q <- Seq("q_dedup_clusters", "q_knn_graph_clusters"); _ <- 1 to 2) run(q)
    spark.stop()
  }
}
