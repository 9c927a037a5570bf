package graft.sources

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Table maintenance — the small-file problem. A long-running ingest
  * (streaming micro-batches, repeated upserts) accretes many small part
  * files per partition directory; at 100 TB the file-listing and
  * per-file open costs eventually dominate scans. Compaction rewrites
  * each oversized partition directory to one file, leaving compact
  * partitions untouched — the same touched-partitions-only discipline as
  * [[IndexCatalog.upsertInto]], so maintenance I/O is proportional to the
  * fragmentation, not the table.
  */
object Maintenance {

  /** Partition directories (relative partition spec path → file count),
    * one level per partition column. */
  private def partitionDirs(root: Path, depth: Int): Seq[Path] = {
    def walk(p: Path, d: Int): Seq[Path] =
      if (d == 0) Seq(p)
      else {
        val s = Files.list(p)
        try {
          val subdirs = s.iterator()
          val buf = scala.collection.mutable.ArrayBuffer.empty[Path]
          while (subdirs.hasNext) {
            val c = subdirs.next()
            if (Files.isDirectory(c) && c.getFileName.toString.contains("="))
              buf ++= walk(c, d - 1)
          }
          buf.toSeq
        } finally s.close()
      }
    walk(root, depth)
  }

  private def parquetFiles(dir: Path): Seq[Path] = {
    val s = Files.list(dir)
    try {
      val it = s.iterator()
      val buf = scala.collection.mutable.ArrayBuffer.empty[Path]
      while (it.hasNext) {
        val f = it.next()
        if (f.getFileName.toString.endsWith(".parquet")) buf += f
      }
      buf.toSeq
    } finally s.close()
  }

  /** Compact every partition directory holding more than `maxFiles` part
    * files down to one file. Returns the number of partitions rewritten.
    *
    * Each fragmented partition is read, coalesced, and WRITE-THEN-SWAPPED:
    * the compacted file lands in a hidden `.compact-tmp` subdirectory
    * (invisible to Spark scans) while the originals are still intact, is
    * moved into the partition directory, and only then are the original
    * part files (and their `.crc` sidecars) deleted. A crash at any point
    * leaves the partition readable — before the move it is untouched;
    * between move and delete it holds duplicate rows that the next
    * compaction run collapses again (compaction input is whatever is in
    * the directory). Compact partitions are never touched (asserted by
    * mtime in the spec). Real deployments run this under a table-format
    * transaction; this is the strongest ordering a bare Parquet directory
    * offers. */
  def compactPartitions(spark: SparkSession, tableDir: String,
                        partitionCols: Seq[String], maxFiles: Int = 1): Int = {
    val root = Paths.get(tableDir)
    require(Files.exists(root), s"no such table dir: $tableDir")
    val fragmented = partitionDirs(root, partitionCols.length)
      .map(d => d -> parquetFiles(d))
      .filter(_._2.length > maxFiles)
    fragmented.foreach { case (dir, files) =>
      // read THIS partition only; partition-col values live in the path,
      // and the rewrite stays inside the directory, so they are inert.
      // The originals stay on disk while the compacted copy is written —
      // no lineage cut needed, the write never overwrites its own input.
      val tmp = dir.resolve(".compact-tmp")
      spark.read.parquet(dir.toString)
        .coalesce(1)
        .write.mode("overwrite").parquet(tmp.toString)
      val compacted = parquetFiles(tmp)
      // land the new file(s) first, then drop the originals + sidecars
      compacted.foreach { f =>
        Files.move(f, dir.resolve(f.getFileName))
        val crc = f.resolveSibling("." + f.getFileName + ".crc")
        if (Files.exists(crc)) Files.move(crc, dir.resolve(crc.getFileName))
      }
      files.foreach { f =>
        Files.delete(f)
        Files.deleteIfExists(f.resolveSibling("." + f.getFileName + ".crc"))
      }
      deleteRecursively(tmp)
    }
    fragmented.size
  }

  private def deleteRecursively(p: Path): Unit = if (Files.exists(p)) {
    val s = Files.walk(p)
    val all = try {
      val it = s.iterator()
      val buf = scala.collection.mutable.ArrayBuffer.empty[Path]
      while (it.hasNext) buf += it.next()
      buf.toSeq
    } finally s.close()
    all.reverse.foreach(Files.delete)
  }

  /** File-count census per partition directory — the health metric that
    * decides when compaction runs. */
  def fileCounts(tableDir: String, partitionCols: Seq[String]): Map[String, Int] = {
    val root = Paths.get(tableDir)
    partitionDirs(root, partitionCols.length)
      .map(d => root.relativize(d).toString -> parquetFiles(d).length)
      .toMap
  }
}
