package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (SURVEY §2 C12).
  *
  * Media assets ride through the engine as opaque `binary` columns with
  * typed metadata alongside. The decode / feature-extract / resize /
  * frame-sample stages run partition-batched so a real codec would be
  * initialized once per partition (the JVM-side equivalent of a vectorized
  * UDF batch). This container has no image/audio libraries, so
  * [[StubCodec]] derives deterministic pseudo-features from the bytes —
  * the Spark-side plumbing (schema, batching, partitioning) is real.
  */
object Multimodal {

  /** Decoded media header + features (what a real codec would emit). */
  final case class MediaFeatures(
      doc_id: Long,
      byte_len: Int,
      width: Int,
      height: Int,
      n_frames: Int,
      frame_offsets: Seq[Int],
      brightness: Double)

  /** Deterministic stand-in for an image/video codec. */
  object StubCodec {
    val FrameSize = 256

    def decode(docId: Long, bytes: Array[Byte]): MediaFeatures = {
      val len = bytes.length
      // "header": dimensions derived from leading bytes, like a real
      // decoder would read them from the container format
      val w = 16 + (if (len > 0) (bytes(0) & 0x7f) else 0)
      val h = 16 + (if (len > 1) (bytes(1) & 0x7f) else 0)
      val nFrames = len / FrameSize + 1
      // frame sampling: fixed-stride offsets into the payload
      val offsets = (0 until nFrames).map(_ * FrameSize)
      // "brightness": mean byte value — stands in for pixel statistics
      var sum = 0L
      var i = 0
      while (i < len) { sum += bytes(i) & 0xff; i += 1 }
      val brightness = if (len == 0) 0.0 else sum.toDouble / len
      MediaFeatures(docId, len, w, h, nFrames, offsets, brightness)
    }

    /** "resize": crop/pad payload to a target byte budget (thumbnailing). */
    def resize(bytes: Array[Byte], target: Int): Array[Byte] =
      java.util.Arrays.copyOf(bytes, math.min(bytes.length, target))
  }

  /** Attach a binary payload column (here: utf-8 of text as a stand-in
    * asset; production replaces this with real object-store bytes). */
  def withPayload(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("text").cast("binary").as("payload"))

  /** Partition-batched decode + feature extraction over binary payloads. */
  def extractFeatures(payloads: DataFrame): Dataset[MediaFeatures] = {
    val spark = payloads.sparkSession
    import spark.implicits._
    payloads.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition: a real implementation initializes the codec here
        it.map { case (id, bytes) => StubCodec.decode(id, bytes) }
      }
  }

  final case class Resized(doc_id: Long, resized: Array[Byte])

  /** "Thumbnailing": partition-batched resize of every asset to a byte
    * budget. Same batching contract as [[extractFeatures]] — a real codec
    * initializes once per partition and processes the iterator. */
  def resize(payloads: DataFrame, target: Int): Dataset[Resized] = {
    val spark = payloads.sparkSession
    import spark.implicits._
    payloads.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        Resized(id, StubCodec.resize(bytes, target))
      })
  }

  final case class Frame(
      doc_id: Long, frame_idx: Int, frame: Array[Byte])

  /** Frame sampling: emit every `stride`-th fixed-size frame of each
    * asset (video keyframe-extraction analog). Flat-mapped per partition,
    * so output rows never materialize per-asset collections. */
  def sampleFrames(
      payloads: DataFrame, frameSize: Int = StubCodec.FrameSize,
      stride: Int = 1): Dataset[Frame] = {
    val spark = payloads.sparkSession
    import spark.implicits._
    payloads.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        val n = bytes.length / frameSize + 1
        (0 until n by stride).iterator.map { i =>
          val from = i * frameSize
          val until = math.min(from + frameSize, bytes.length)
          Frame(id, i, java.util.Arrays.copyOfRange(bytes, from, until))
        }
      })
  }

  /** C55: perceptual media dedup — near-duplicate assets by FRAME-HASH
    * set overlap: each asset's fixed-size frames hash to md5 digests
    * (with a real codec these are perceptual frame fingerprints; the
    * byte-slice stub keeps the plumbing byte-exact and oracle-able),
    * assets sharing hashed frames pair through a digest join, and the
    * near-dup verdict is frame-set Jaccard ≥ τ — the re-encoded /
    * re-muxed copy detector, which C12's whole-asset digests miss the
    * moment one byte of container metadata differs.
    *
    * Scale shape (the [[graft.operators.Dedup.ngramJaccard]] recipe on
    * media): 16-byte digests shuffle, payload bytes never do; pair
    * fan-out is bounded by `maxHashDf` (an intro/outro frame shared by
    * thousands of assets is a stop-gram, not a join key); the τ
    * threshold compares as an exact integer cross-multiplication
    * (`τDen·common ≥ τNum·union`), so the verdict is engine-exact. */
  def mediaDedup(docs: DataFrame, maxHashDf: Int = 64,
      tauNum: Int = 1, tauDen: Int = 5,
      frameSize: Int = StubCodec.FrameSize): DataFrame = {
    val frames = withPayload(docs)
      .withColumn("nf",
        expr(s"octet_length(payload) div $frameSize + 1"))
      .select(col("doc_id"),
        explode(expr("sequence(0, nf - 1)")).as("fi"), col("payload"))
      .select(col("doc_id"),
        md5(expr(s"substring(payload, fi * $frameSize + 1, $frameSize)"))
          .as("h"))
      .distinct()
      .localCheckpoint() // sizes, hot-filter and the pair join share it
    val sizes = frames.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val keep = frames.groupBy("h").agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxHashDf).select("h")
    val kept = frames.join(keep, "h")
    val pairs = kept.as("a")
      .join(kept.as("b"), col("a.h") === col("b.h") &&
        col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_common"))
    pairs
      .join(sizes.select(col("doc_id").as("doc_a"), col("sz").as("n_a")),
        "doc_a")
      .join(sizes.select(col("doc_id").as("doc_b"), col("sz").as("n_b")),
        "doc_b")
      .filter(lit(tauDen.toLong) * col("n_common") >=
        lit(tauNum.toLong) * (col("n_a") + col("n_b") - col("n_common")))
      .select(col("doc_a"), col("doc_b"), col("n_common"), col("n_a"),
        col("n_b"),
        (col("n_common").cast("double") /
          (col("n_a") + col("n_b") - col("n_common")).cast("double"))
          .as("jaccard"))
  }
}
