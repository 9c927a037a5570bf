package graft.sources

import java.nio.file.{Files, Paths}
import java.nio.file.attribute.FileTime

import graft.SparkSpecBase
import org.scalatest.matchers.should.Matchers

/** Gates for the cross-process writer lease ([[WriterLease]]): a second
  * concurrent maintainer is refused with an actionable message, a
  * crash-stale lease self-heals by age, same-thread nesting re-enters,
  * and the real maintenance entry points actually ride it. */
class WriterLeaseSpec extends SparkSpecBase with Matchers {

  test("a foreign lease file refuses maintenance with an actionable message; a stale one is taken over") {
    import spark.implicits._
    val layout = InvertedIndex.cloneIndex(spark, sfDir, "lease-test")
    val root = Paths.get(layout.dataPath).getParent
    val lock = WriterLease.lockFileOf(root)
    // simulate another PROCESS holding the lease (fresh mtime)
    Files.write(lock, "pid=99999 ts=now".getBytes)
    val batch = Seq((InvertedIndex.UpsertIdOffset + 901L, "lease test doc"))
      .toDF("doc_id", "text")
    val e = intercept[IllegalStateException] {
      InvertedIndex.upsertDocs(spark, layout, batch)
    }
    e.getMessage should include("writer lease")
    e.getMessage should include("refused")
    // age the lease past the stale bound: the next maintainer takes over
    Files.setLastModifiedTime(lock,
      FileTime.fromMillis(System.currentTimeMillis() - WriterLease.StaleMs - 1000))
    InvertedIndex.upsertDocs(spark, layout, batch)
    // ... and releases cleanly
    Files.exists(lock) shouldBe false
    InvertedIndex.bm25Over(spark, layout).collect() // index still serves
  }

  test("same-thread nesting re-enters; a second thread is refused while the lease is held") {
    val root = Paths.get(graft.Scratch.dir("lease-nest"))
    WriterLease.withLease(root) {
      WriterLease.withLease(root) { 42 }
    } shouldBe 42
    Files.exists(WriterLease.lockFileOf(root)) shouldBe false
    // hold the lease on one thread; a second thread must be refused
    // fail-fast (never queued)
    val entered = new java.util.concurrent.CountDownLatch(1)
    val release = new java.util.concurrent.CountDownLatch(1)
    val holder = new Thread(() => WriterLease.withLease(root) {
      entered.countDown(); release.await()
    })
    holder.start()
    entered.await()
    try {
      val e = intercept[IllegalStateException] {
        WriterLease.withLease(root) { () }
      }
      e.getMessage should include("refused")
    } finally {
      release.countDown()
      holder.join()
    }
    Files.exists(WriterLease.lockFileOf(root)) shouldBe false
  }
}
