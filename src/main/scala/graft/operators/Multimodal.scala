package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.Tables

/** Multimodal-column plumbing (builder brief): opaque `binary` payloads +
  * typed metadata, with decode/feature-extract as per-partition batch
  * operators.
  *
  * Two tiers. [[imageDecode]] is a REAL codec path — PNG encode and
  * decode through the JDK's built-in `javax.imageio` (no external
  * libraries needed), oracle-checked end to end because the synthesized
  * pixels follow a closed form DuckDB can recompute and PNG is lossless.
  * For formats the JDK cannot decode (JPEG2000, video, audio), the
  * decode step is a clearly-marked deterministic STUB — the Spark-side
  * contract (schema, binary columns, partition-batch processing shape,
  * feature vector output) is real and tested either way.
  */
object Multimodal {

  /** Ingest: attach a binary payload column + typed metadata. In a real
    * pipeline the payload is the raw image/audio bytes read from object
    * storage; here it is the UTF-8 document text, which keeps the checksum
    * oracle-checkable (md5 agrees across engines).
    */
  def ingest(spark: SparkSession, dir: String): DataFrame =
    Tables.table(spark, dir, "documents").select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      lit("text/plain").as("mime"),
      octet_length(encode(col("text"), "UTF-8")).cast("long").as("n_bytes"),
      md5(encode(col("text"), "UTF-8")).as("checksum"))

  /** Driver-contract projection of [[ingest]] (binary column stays
    * internal; the oracle checks the typed metadata).
    */
  def ingestMeta(spark: SparkSession, dir: String): DataFrame =
    ingest(spark, dir).select("doc_id", "mime", "n_bytes", "checksum")

  /** The `binaryFile` SOURCE roundtrip — how raw image/audio/video blobs
    * actually enter a Spark pipeline at scale (one row per object-store
    * file: path, length, modificationTime, content), as opposed to
    * [[ingest]]'s already-tabular payloads. One file per document is
    * staged (UTF-8 text bytes, written distributed via foreachPartition),
    * read back through `spark.read.format("binaryFile")`, and verified by
    * content checksum + the source's OWN `length` metadata column against
    * the documents oracle — proving the bytes survive the file boundary
    * and the source's metadata is trustworthy. At 100 TB the same plan
    * reads object storage listings; the per-file row is the unit of
    * parallelism (small-file compaction is [[graft.operators.Layout]]'s
    * territory).
    */
  def binaryFilesRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val tmp = System.getProperty("java.io.tmpdir") +
      s"/graft_binfiles_${spark.sparkContext.applicationId}_${Integer.toHexString(dir.hashCode)}"
    if (!new java.io.File(tmp).exists()) {
      new java.io.File(tmp).mkdirs()
      Tables.table(spark, dir, "documents")
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("b"))
        .foreachPartition { (it: Iterator[Row]) =>
          it.foreach { r =>
            java.nio.file.Files.write(
              java.nio.file.Paths.get(tmp, s"${r.getLong(0)}.bin"),
              r.getAs[Array[Byte]]("b"))
          }
        }
    }
    spark.read.format("binaryFile").option("pathGlobFilter", "*.bin").load(tmp)
      .select(
        regexp_extract(col("path"), "([0-9]+)\\.bin$", 1).cast("long").as("doc_id"),
        col("length").as("n_bytes"),
        md5(col("content")).as("checksum"))
      .orderBy(col("doc_id"))
  }

  private val FeatureBins = 16

  /** STUB decoder — stands in for image/audio decode (codec libraries are
    * not installed here). Deterministic: "decodes" the payload into a
    * normalized 16-bin byte histogram. The real implementation swaps this
    * function body for e.g. a JPEG decode + resize; everything around it
    * (binary input batches, fixed-width feature output, per-partition
    * execution) is the production shape.
    */
  private def stubDecode(payload: Array[Byte]): Array[Double] = {
    val hist = new Array[Double](FeatureBins)
    payload.foreach(b => hist((b & 0xff) * FeatureBins / 256) += 1.0)
    val n = math.max(payload.length, 1)
    hist.map(_ / n)
  }

  /** Feature extraction over binary payloads via `mapPartitions` — the
    * batch-at-a-time execution shape a real decoder needs (amortized model
    * / codec init per partition, not per row). Output: fixed-width feature
    * vector + dimensions metadata.
    */
  def features(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    ingest(spark, dir).select("doc_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions { iter =>
        // per-partition init happens here (codec/model load in production)
        iter.map { case (docId, payload) =>
          (docId, payload.length.toLong, stubDecode(payload))
        }
      }
      .toDF("doc_id", "n_bytes", "features")
  }

  private val ResizeDim = 8

  /** STUB resize — stands in for image resize / audio resample: average-
    * pools the payload byte signal to a fixed [[ResizeDim]]-length vector.
    * Same mapPartitions batch shape as a real resampler.
    */
  def resize(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    ingest(spark, dir).select("doc_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions { iter =>
        iter.map { case (docId, payload) =>
          val n = payload.length
          val pooled = Array.tabulate(ResizeDim) { i =>
            val from = i * n / ResizeDim
            val to = math.max((i + 1) * n / ResizeDim, from + 1)
            val slice = payload.slice(from, to)
            slice.map(_ & 0xff).sum.toDouble / slice.length
          }
          (docId, n.toLong, pooled)
        }
      }
      .toDF("doc_id", "n_bytes", "resized")
  }

  private val FrameLen = 32
  private val FrameStride = 100

  /** STUB frame sampling — stands in for video frame extraction: every
    * [[FrameStride]] bytes, take a [[FrameLen]]-byte "frame" and emit its
    * checksum. One row per (doc, frame): the explode shape a real
    * frame-sampler produces, and oracle-checkable because frames are
    * substrings of the ASCII payload (md5 agrees across engines).
    */
  def frameSample(spark: SparkSession, dir: String): DataFrame =
    Tables.table(spark, dir, "documents")
      .select(col("doc_id"),
        posexplode(expr(
          s"""transform(sequence(0, CAST((length(text) - 1) DIV $FrameStride AS INT)),
             |  i -> md5(substr(text, i * $FrameStride + 1, $FrameLen)))""".stripMargin)))
      .toDF("doc_id", "frame_no", "frame_checksum")

  private val ImgW = 16
  private val ImgH = 16

  /** Channel value of the synthesized test image at `(x, y, c)` for a
    * document — the closed form BOTH engines evaluate: Spark renders it
    * into real PNG bytes and decodes them back; the DuckDB oracle sums
    * the formula directly. All terms stay far below 2⁶³ (doc_id is
    * reduced first), so the arithmetic is overflow-free in either engine.
    */
  private def channel(docId: Long, x: Int, y: Int, c: Int): Int =
    (((docId % 1000003L) * 31L + x * 7L + y * 13L + c * 5L) % 256L).toInt

  /** REAL image decode, end to end: per document, render the closed-form
    * [[channel]] pixels into an actual PNG via the JDK's built-in
    * `javax.imageio` codec, then — in a separate per-partition pass, the
    * way a production decoder consumes a binary column it didn't write —
    * decode the bytes back and emit exact integer stats (dimensions +
    * total RGB mass). PNG is lossless 8-bit RGB, so decode(encode(img))
    * is bit-exact and the DuckDB oracle can recompute `px_sum` from the
    * closed form without any codec: the oracle equality holds only if
    * the REAL encode→decode roundtrip preserved every pixel.
    *
    * Scale shape: both passes are `mapPartitions` (codec init amortized
    * per partition, not per row); payloads never shuffle — the stats
    * reduce to 4 numbers per doc at the decode site.
    */
  def imageDecode(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ids = Tables.table(spark, dir, "documents")
      .select(col("doc_id")).as[Long]
    val pngs = ids.mapPartitions { iter =>
      iter.map { id =>
        val img = new java.awt.image.BufferedImage(
          ImgW, ImgH, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < ImgH) {
          var x = 0
          while (x < ImgW) {
            img.setRGB(x, y, (channel(id, x, y, 0) << 16) |
              (channel(id, x, y, 1) << 8) | channel(id, x, y, 2))
            x += 1
          }
          y += 1
        }
        val out = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", out)
        (id, out.toByteArray)
      }
    }.toDF("doc_id", "png").as[(Long, Array[Byte])]
    pngs.mapPartitions { iter =>
      iter.map { case (id, bytes) =>
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        var sum = 0L
        var y = 0
        while (y < img.getHeight) {
          var x = 0
          while (x < img.getWidth) {
            val rgb = img.getRGB(x, y)
            sum += ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
            x += 1
          }
          y += 1
        }
        (id, img.getWidth, img.getHeight, sum)
      }
    }.toDF("doc_id", "width", "height", "px_sum")
      .orderBy("doc_id")
  }

  private val AudioN = 256
  private val AudioRate = 8000f

  /** 16-bit PCM sample `i` of the synthesized test clip for a document —
    * the closed form both engines evaluate (see [[channel]]).
    */
  private def pcmSample(docId: Long, i: Int): Int =
    ((((docId % 1000003L) * 31L + i * 17L) % 65536L) - 32768L).toInt

  /** REAL audio decode, end to end — the WAV twin of [[imageDecode]]:
    * render the closed-form [[pcmSample]] signal into an actual RIFF/WAV
    * container via the JDK's built-in `javax.sound.sampled`, decode the
    * bytes back in a separate per-partition pass, and emit exact integer
    * stats (frame count, sample rate, total signed amplitude). PCM16 in
    * WAV is lossless, so the DuckDB oracle recomputes `amp_sum` from the
    * closed form — equality proves the real container roundtrip.
    */
  def audioDecode(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import javax.sound.sampled._
    val ids = Tables.table(spark, dir, "documents")
      .select(col("doc_id")).as[Long]
    val wavs = ids.mapPartitions { iter =>
      iter.map { id =>
        val pcm = new Array[Byte](AudioN * 2) // little-endian PCM16 mono
        var i = 0
        while (i < AudioN) {
          val s = pcmSample(id, i)
          pcm(2 * i) = (s & 0xff).toByte
          pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
          i += 1
        }
        val fmt = new AudioFormat(AudioRate, 16, 1, true, false)
        val ais = new AudioInputStream(
          new java.io.ByteArrayInputStream(pcm), fmt, AudioN.toLong)
        val out = new java.io.ByteArrayOutputStream()
        AudioSystem.write(ais, AudioFileFormat.Type.WAVE, out)
        (id, out.toByteArray)
      }
    }.toDF("doc_id", "wav").as[(Long, Array[Byte])]
    wavs.mapPartitions { iter =>
      iter.map { case (id, bytes) =>
        val ais = AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(bytes))
        val rate = ais.getFormat.getSampleRate.toInt
        val data = ais.readAllBytes()
        val n = data.length / 2
        var sum = 0L
        var i = 0
        while (i < n) {
          // sign lives in the high byte: sign-extend it, OR the low byte
          sum += (data(2 * i + 1).toInt << 8) | (data(2 * i) & 0xff)
          i += 1
        }
        (id, n, rate, sum)
      }
    }.toDF("doc_id", "n_samples", "sample_rate", "amp_sum")
      .orderBy("doc_id")
  }

  /** Driver-contract summary of [[features]], in exact integers: per-source
    * doc/byte totals plus the total mass of histogram bin 6 (bytes
    * 0x60–0x6f — for the ASCII fixture text, exactly the chars `[a-o]`,
    * which is what makes the stub decoder's output ORACLE-CHECKABLE in SQL:
    * the bin count is recovered as `round(f6 · n_bytes)`).
    */
  def featureSummary(spark: SparkSession, dir: String): DataFrame = {
    val src = Tables.table(spark, dir, "documents").select("doc_id", "source")
    features(spark, dir)
      .join(src, "doc_id")
      .select(col("source"), col("n_bytes"),
        round(col("features").getItem(6) * col("n_bytes")).cast("long").as("f6"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_bytes")).as("total_bytes"),
        sum(col("f6")).as("f6_bytes"))
  }
}
