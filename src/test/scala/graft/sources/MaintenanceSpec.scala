package graft.sources

import graft.SparkSpecBase
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

class MaintenanceSpec extends SparkSpecBase with Matchers {

  test("compaction collapses fragmented partitions, leaves compact ones untouched") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-compact").toString + "/t"
    // partition a: written in 4 slices (4 part files); partition b: 1 file
    (1 to 4).foreach { i =>
      Seq((i.toLong, s"row$i", "a")).toDF("id", "payload", "part")
        .write.mode("append").partitionBy("part").parquet(dir)
    }
    Seq((100L, "rowb", "b")).toDF("id", "payload", "part")
      .write.mode("append").partitionBy("part").parquet(dir)

    val before = Maintenance.fileCounts(dir, Seq("part"))
    before("part=a") shouldBe 4
    before("part=b") shouldBe 1
    val contentBefore = spark.read.parquet(dir).collect().map(_.toString).sorted

    val bFile = java.nio.file.Files.list(java.nio.file.Paths.get(dir, "part=b"))
      .iterator().next()
    val bMtime = java.nio.file.Files.getLastModifiedTime(bFile).toMillis

    Maintenance.compactPartitions(spark, dir, Seq("part")) shouldBe 1

    val after = Maintenance.fileCounts(dir, Seq("part"))
    after("part=a") shouldBe 1
    after("part=b") shouldBe 1
    // content identical, untouched partition file untouched
    spark.read.parquet(dir).collect().map(_.toString).sorted shouldBe contentBefore
    java.nio.file.Files.getLastModifiedTime(bFile).toMillis shouldBe bMtime
    // second run is a no-op
    Maintenance.compactPartitions(spark, dir, Seq("part")) shouldBe 0
  }
}
