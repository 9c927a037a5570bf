package graft

// scratch probe — delete before commit
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("probe")
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    def run(q: String): Unit = {
      val t0 = System.nanoTime()
      SparkEntry.queries(q)(spark, dir).write.mode("overwrite").format("noop").save()
      println(f"$q: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    run("q_knn") // warm
    for (_ <- 1 to 3; q <- Seq("q_knn_auto", "q_l2_auto", "q_dot_auto",
      "q_radius_auto", "q_lsh_auto", "q_ann_batch_auto")) run(q)
    spark.stop()
  }
}
