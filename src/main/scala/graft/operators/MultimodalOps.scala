package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (north-star): media as opaque `binary`
  * columns with typed metadata alongside.
  *
  * The Spark-side plumbing is what actually matters at 100 TB: binary
  * columns survive Parquet scans with column pruning (a metadata-only
  * query never reads the blob bytes), per-row feature extraction is a
  * map-side projection, and frame sampling is byte-slicing on the binary
  * column. Decoding runs through the [[MediaCodec]] seam in
  * [[decodePartitions]] (one codec init per partition, rows streamed
  * through in batch): [[ImageIoCodec]] is a REAL pure-JVM image decode
  * (the JDK's own PNG/JPEG/GIF/BMP readers); [[StubCodec]] is the
  * deterministic sha-derived stand-in for media types whose codecs don't
  * exist in this environment (audio/video — no native libs, zero egress),
  * and the fallback for undecodable bytes.
  */
object Multimodal {

  /** Stand-in media blob: the document's UTF-8 bytes. In production this
    * column comes straight from the media files' Parquet ingestion. */
  def toBlob(text: Column): Column = text.cast("binary")

  /** STUB decode — fake but deterministic media dimensions from the
    * content hash. Real implementation: `mapPartitions` with a codec,
    * same output schema. */
  def decodeStub(blob: Column): Column = {
    val sha = sha2(blob, 256)
    struct(
      length(blob).cast("long").as("n_bytes"),
      (conv(substring(sha, 1, 4), 16, 10).cast("long") % 1280).as("width"),
      (conv(substring(sha, 5, 4), 16, 10).cast("long") % 720).as("height"),
      (conv(substring(sha, 9, 4), 16, 10).cast("long") % 240 + 1).as("n_frames"))
  }

  /** Frame sampling as byte slices: n even offsets into the blob, each a
    * fixed-width window (binary substring is O(slice), not O(blob)). */
  def frameSample(blob: Column, n: Int, frameBytes: Int): Column =
    transform(sequence(lit(0), lit(n - 1)),
      i => substring(blob, (i * greatest(length(blob) / n, lit(1)) + 1).cast("int"), lit(frameBytes)))

  /** STUB resize: a real implementation decodes, scales, and re-encodes;
    * with no codecs in this environment the stand-in deterministically
    * down-samples the byte stream to the target "pixel" budget (every
    * k-th byte), preserving the plumbing contract a real resize has —
    * binary in, smaller binary out, new dimensions in metadata. */
  def resizeStub(blob: Column, targetW: Int, targetH: Int): Column = {
    val budget = targetW * targetH
    val stride = greatest(ceil(length(blob).cast("double") / budget).cast("int"), lit(1))
    val slices = transform(sequence(lit(0),
      greatest(ceil(length(blob).cast("double") / stride).cast("int"), lit(1)) - 1),
      i => substring(blob, (i * stride + 1).cast("int"), lit(1)))
    struct(
      aggregate(slices, lit(Array.emptyByteArray), (acc, x) => concat(acc, x)).as("blob"),
      lit(targetW.toLong).as("width"),
      lit(targetH.toLong).as("height"))
  }

  case class MediaMeta(doc_id: Long, n_bytes: Long, width: Long, height: Long,
                       n_frames: Long)

  /** The `mapPartitions` slot a real codec drops into: one decoder
    * instance per partition (codec/model init is the expensive part —
    * never per row), rows streamed through it in batch. The default
    * [[StubCodec]] derives the same sha-based fake dimensions as
    * [[decodeStub]], so the two paths are asserted equal in tests;
    * [[ImageIoCodec]] is the real pure-JVM image decode behind the same
    * seam. The factory (not a codec instance) crosses the serialization
    * boundary — codecs themselves need not be serializable. */
  def decodePartitions(blobs: org.apache.spark.sql.Dataset[(Long, Array[Byte])],
                       codecFactory: () => MediaCodec = () => new StubCodec)
  : org.apache.spark.sql.Dataset[MediaMeta] = {
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.mapPartitions { it =>
      val codec = codecFactory() // per-partition init
      it.map { case (id, bytes) => codec.decode(id, bytes) }
    }
  }

  /** The per-partition decode seam: blob bytes in, typed metadata out. */
  trait MediaCodec {
    def decode(id: Long, bytes: Array[Byte]): MediaMeta
  }

  /** STUB in place of codecs absent from this environment (no native
    * image/audio libs beyond the JDK). Deterministic: metadata from the
    * content's sha256, matching [[decodeStub]]'s arithmetic. */
  final class StubCodec extends MediaCodec {
    private val md = java.security.MessageDigest.getInstance("SHA-256")
    def decode(id: Long, bytes: Array[Byte]): MediaMeta = {
      md.reset()
      val d = md.digest(bytes)
      def u16(i: Int): Long = ((d(i) & 0xffL) << 8) | (d(i + 1) & 0xffL)
      MediaMeta(id, bytes.length.toLong,
        u16(0) % 1280, u16(2) % 720, u16(4) % 240 + 1)
    }
  }

  /** REAL image decode on the pure-JVM `javax.imageio` stack (PNG/JPEG/
    * GIF/BMP readers ship with the JDK — no native libs, works in this
    * zero-egress sandbox). Returns actual pixel dimensions; n_frames is 1
    * (still image). Bytes that no installed reader accepts fall back to
    * the deterministic [[StubCodec]] metadata rather than failing the
    * partition — at 100 TB a corrupt blob must cost one row, not a task
    * retry storm. `ImageIO.setUseCache(false)` keeps decoding in-memory:
    * the default disk-backed cache would add a temp-file write per row. */
  final class ImageIoCodec extends MediaCodec {
    javax.imageio.ImageIO.setUseCache(false)
    private val fallback = new StubCodec
    private[operators] val contentDigest =
      java.security.MessageDigest.getInstance("SHA-256")
    private[operators] def readImage(bytes: Array[Byte]): java.awt.image.BufferedImage =
      // NonFatal, not just IOException: JDK readers throw runtime
      // exceptions (AIOOBE, IllegalArgument, CMMException) on
      // corrupt-but-recognized bytes — any of them escaping here would
      // fail the task and start the retry storm the codec exists to avoid
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      catch { case scala.util.control.NonFatal(_) => null }
    def decode(id: Long, bytes: Array[Byte]): MediaMeta = {
      val img = readImage(bytes)
      if (img == null) fallback.decode(id, bytes)
      else MediaMeta(id, bytes.length.toLong,
        img.getWidth.toLong, img.getHeight.toLong, n_frames = 1L)
    }
    /** REAL resize: decode, box-filter scale ([[boxScale]] — synchronous,
      * bit-deterministic), re-encode PNG. Undecodable bytes pass through
      * unchanged — one bad row costs one row. */
    def resize(bytes: Array[Byte], w: Int, h: Int): Array[Byte] = {
      val img = readImage(bytes)
      if (img == null) return bytes
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(boxScale(img, w, h), "png", out)
      out.toByteArray
    }
  }

  /** Synchronous integer box-filter scale. AWT's `getScaledInstance`
    * produces pixels ASYNCHRONOUSLY — `drawImage(scaledInstance, …, null)`
    * can return before any pixel exists, silently yielding a blank target
    * (and, downstream, an all-zero aHash that pairs unrelated images).
    * This walks the source raster directly: target pixel (x,y) averages
    * the source box [x·sw/w, (x+1)·sw/w) × [y·sh/h, (y+1)·sh/h) per
    * channel in integer arithmetic — synchronous, no observer protocol,
    * and bit-identical across JVMs (no AWT filter-implementation drift). */
  private[operators] def boxScale(img: java.awt.image.BufferedImage,
                                  w: Int, h: Int): java.awt.image.BufferedImage = {
    val (sw, sh) = (img.getWidth, img.getHeight)
    val dst = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      val y0 = y.toLong * sh / h; val y1 = math.max(y0 + 1, (y + 1).toLong * sh / h)
      var x = 0
      while (x < w) {
        val x0 = x.toLong * sw / w; val x1 = math.max(x0 + 1, (x + 1).toLong * sw / w)
        var (r, g, b) = (0L, 0L, 0L)
        var sy = y0
        while (sy < y1) {
          var sx = x0
          while (sx < x1) {
            val rgb = img.getRGB(sx.toInt, sy.toInt)
            r += (rgb >> 16) & 0xff; g += (rgb >> 8) & 0xff; b += rgb & 0xff
            sx += 1
          }
          sy += 1
        }
        val n = (x1 - x0) * (y1 - y0)
        dst.setRGB(x, y,
          (((r / n) << 16) | ((g / n) << 8) | (b / n)).toInt)
        x += 1
      }
      y += 1
    }
    dst
  }

  /** 64-bit average-hash (aHash) of an image blob: decode → 8×8
    * area-averaged grayscale → bit i set iff that cell's luminance exceeds
    * the 64-cell mean. Integer luminance (299r+587g+114b)/1000 and the
    * deterministic scaler keep the hash reproducible across runs/JVMs.
    * Undecodable bytes hash their CONTENT (sha-prefix), so non-images
    * still dedup exactly; cross-space hamming-≤3 collisions between a
    * sha-prefix and a real aHash are as unlikely as any random 64-bit
    * near-collision. */
  def ahash64(codec: ImageIoCodec, bytes: Array[Byte]): Long = {
    val img = codec.readImage(bytes)
    if (img == null) {
      // per-codec digest instance (StubCodec pattern) — never a
      // MessageDigest.getInstance per row on the map-side hot path
      codec.contentDigest.reset()
      val d = codec.contentDigest.digest(bytes)
      return (0 until 8).foldLeft(0L)((acc, i) => (acc << 8) | (d(i) & 0xffL))
    }
    val scaled = boxScale(img, 8, 8)
    val lum = new Array[Long](64)
    var total = 0L
    var i = 0
    while (i < 64) {
      val rgb = scaled.getRGB(i % 8, i / 8)
      lum(i) = (((rgb >> 16) & 0xff) * 299L + ((rgb >> 8) & 0xff) * 587L +
        (rgb & 0xff) * 114L) / 1000L
      total += lum(i)
      i += 1
    }
    val mean = total / 64L
    var h = 0L
    i = 0
    while (i < 64) { if (lum(i) > mean) h |= 1L << i; i += 1 }
    h
  }

  /** Per-partition aHash pass — the dedup-signature analog of
    * [[decodePartitions]]. */
  def ahashPartitions(blobs: org.apache.spark.sql.Dataset[(Long, Array[Byte])])
  : DataFrame = {
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.mapPartitions { it =>
      val codec = new ImageIoCodec
      it.map { case (id, bytes) => (id, ahash64(codec, bytes)) }
    }.toDF("media_id", "ahash")
  }

  /** Perceptual near-dup pairs at hamming ≤ maxHamming over the 64-bit
    * aHash — [[Dedup.simhashPairs]]'s banding transplanted to images:
    * 4 × 16-bit chunks are pigeonhole-lossless for hamming ≤ 3, so the
    * banded equi-join is an optimization, never a recall loss. At 100 TB
    * the hash pass is map-side; only (media_id, hash, chunk) tuples
    * shuffle. */
  def imageNearDupPairs(hashes: DataFrame, maxHamming: Int = 3): DataFrame = {
    require(maxHamming <= 3, "4-chunk banding is only lossless for hamming <= 3")
    val chunked = hashes.select(col("media_id"), col("ahash"),
      posexplode(array((0 until 4).map(k =>
        shiftright(col("ahash"), 16 * k).bitwiseAND(lit(0xffffL))): _*)))
      .toDF("media_id", "ahash", "chunk_idx", "chunk_val")
    chunked.as("a")
      .join(chunked.as("b"),
        col("a.chunk_idx") === col("b.chunk_idx") &&
          col("a.chunk_val") === col("b.chunk_val") &&
          col("a.media_id") < col("b.media_id"))
      .select(col("a.media_id").as("media_a"), col("b.media_id").as("media_b"),
        bit_count(col("a.ahash").bitwiseXOR(col("b.ahash"))).as("hamming"))
      // hamming is functionally determined by the pair, so filtering BEFORE
      // the distinct is equivalent — and shrinks the dedup shuffle to only
      // near-duplicate pairs instead of every chunk-sharing candidate
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** SplitMix64 finalizer (Steele et al., public domain) — the
    * deterministic 64-bit scrambler behind the synthetic image fixtures:
    * pure arithmetic, so the "random" group patterns are identical on
    * every run, JVM, and executor. */
  private def splitmix64(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  /** Deterministic synthetic test image for id: a 64×64 PNG of 8×8
    * black/white cells whose pattern is splitmix64(id % groups) — so ids
    * sharing a group render near-identical images — with ONE cell
    * inverted per later copy (copy = id / groups), making within-group
    * aHash hamming exactly 1 and cross-group hamming ~32 (two scrambled
    * 64-bit patterns). This is the image-side analog of the planted
    * near-dup corpora the text dedup specs use: the near-dup structure is
    * known by construction, so the query's recall is assertable without
    * any external image fixtures (none exist in this environment). */
  def renderSyntheticPng(id: Long, groups: Int): Array[Byte] = {
    val pattern = splitmix64(id % groups)
    val copy = (id / groups).toInt
    val flipCell = if (copy == 0) -1 else (copy * 31) % 64
    val img = new java.awt.image.BufferedImage(64, 64,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < 64) {
      var x = 0
      while (x < 64) {
        val cell = (y / 8) * 8 + (x / 8)
        val on = (((pattern >>> cell) & 1L) == 1L) ^ (cell == flipCell)
        img.setRGB(x, y, if (on) 0xffffff else 0x000000)
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Real image resize over the same per-partition batching as
    * [[decodePartitions]]: one codec per partition, (id, blob) in →
    * (id, resized blob) out. The [[resizeStub]] column expression remains
    * the engine-portable stand-in for codec-less media types. */
  def resizePartitions(blobs: org.apache.spark.sql.Dataset[(Long, Array[Byte])],
                       w: Int, h: Int)
  : org.apache.spark.sql.Dataset[(Long, Array[Byte])] = {
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.mapPartitions { it =>
      val codec = new ImageIoCodec
      it.map { case (id, bytes) => (id, codec.resize(bytes, w, h)) }
    }
  }
}

/** Declared query + oracle for the multimodal surface. */
object MultimodalOps {

  /** Q-multimodal-meta: blob ingestion + metadata extraction + stub
    * decode, all engine-portable (sha256 arithmetic is identical in
    * DuckDB). */
  def multimodalMeta(spark: SparkSession, dir: String): DataFrame = {
    val blob = Multimodal.toBlob(col("text"))
    Tables.documents(spark, dir)
      .select(col("doc_id"), blob.as("blob"))
      .withColumn("meta", Multimodal.decodeStub(col("blob")))
      .select(
        col("doc_id"),
        col("meta.n_bytes").as("n_bytes"),
        substring(sha2(col("blob"), 256), 1, 16).as("sha_prefix"),
        col("meta.width").as("width"),
        col("meta.height").as("height"),
        col("meta.n_frames").as("n_frames"))
      .orderBy(col("doc_id"))
  }

  val multimodalMetaSql: String =
    """SELECT doc_id,
      |  octet_length(encode(text)) AS n_bytes,
      |  substr(sha256(text), 1, 16) AS sha_prefix,
      |  CAST('0x' || substr(sha256(text), 1, 4) AS BIGINT) % 1280 AS width,
      |  CAST('0x' || substr(sha256(text), 5, 4) AS BIGINT) % 720 AS height,
      |  CAST('0x' || substr(sha256(text), 9, 4) AS BIGINT) % 240 + 1 AS n_frames
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Groups for [[imageNearDup]]'s planted corpus: ids < 2×this render as
    * 40 base images (ids 0–39) plus one near-dup copy each (ids 40–79,
    * one cell inverted), present at every testdata SF. */
  val ImageNearDupGroups = 40

  /** Q-image-neardup: perceptual image near-duplicate pairs — the FULL
    * real-decode path (PNG render → javax.imageio decode → box-filter
    * 8×8 → 64-bit aHash → pigeonhole-banded pair join) as a declared
    * query over a planted corpus derived from the documents table.
    * Rows-only by design: zlib-style, there is no DuckDB twin for an
    * image decode; recall is assertable instead because the near-dup
    * structure is known by construction (MultimodalSpec pins the exact
    * 40 planted pairs at hamming 1). At 100 TB the hash pass is map-side
    * behind the per-partition codec seam; only (media_id, hash, chunk)
    * tuples shuffle. */
  def imageNearDup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val g = ImageNearDupGroups
    val blobs = Tables.documents(spark, dir)
      .filter(col("doc_id") < 2 * g)
      .select(col("doc_id")).as[Long]
      .mapPartitions(_.map(id => (id, Multimodal.renderSyntheticPng(id, g))))
    Multimodal.imageNearDupPairs(Multimodal.ahashPartitions(blobs), maxHamming = 3)
      .orderBy(col("media_a"), col("media_b"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_multimodal_meta" -> (multimodalMeta _),
    "q_image_neardup" -> (imageNearDup _))

  def oracles: Map[String, String] = Map(
    "q_multimodal_meta" -> multimodalMetaSql)
}
