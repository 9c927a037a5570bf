package graft

import graft.operators.EmbedOps
import org.apache.spark.sql.SparkSession

/** Interactive search REPL — the reference's user surface
  * (`main.go:190-213`): read a query line from stdin, embed it, top-K
  * cosine search, print matches WITH their text (the fetch-join the
  * reference intended, `main.go:216-262`, fixing bug B3), until the
  * literal `end`.
  *
  * The index is built once up front and cached — the reference re-derives
  * its session/project state on every action (`upsert/upsert.go:116-137`,
  * SURVEY.md §4.1); an interactive surface should pay index build once.
  *
  * Run: `sbt "runMain graft.SearchRepl [sfDir] [k]"`, type queries, `end`.
  */
object SearchRepl {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val k = args.lift(1).map(_.toInt).getOrElse(5)
    val spark = Sessions.local("graft-repl")
    spark.sparkContext.setLogLevel("ERROR")

    val index = EmbedOps.buildIndex(Tables.documents(spark, sfDir)).cache()
    val n = index.count() // materialize the cache before the first query
    println(s"index ready: $n documents from $sfDir (type a query, 'end' to quit)")

    val in = scala.io.Source.stdin.getLines()
    var done = false
    while (!done && in.hasNext) {
      val line = in.next().trim
      if (line.equalsIgnoreCase("end")) done = true
      else if (line.nonEmpty) {
        val t0 = System.nanoTime()
        val rows = EmbedOps.searchByText(spark, index, line, k).collect()
        val ms = (System.nanoTime() - t0) / 1e6
        rows.foreach { r =>
          println(f"  ${r.getDouble(2)}%.6f  doc=${r.getLong(0)}%-6d [${r.getString(1)}] ${r.getString(3)}")
        }
        println(f"  ($ms%.0f ms)")
      }
    }
    spark.stop()
  }
}
