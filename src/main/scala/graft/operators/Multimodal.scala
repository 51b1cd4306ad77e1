package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal-column plumbing: image/audio/video payloads as opaque
  * `binary` columns with typed metadata structs, plus partition-wise
  * decode / feature-extract / resize / frame-sample operators.
  *
  * Decode kernels: the two codec-free formats are REAL — binary PPM
  * images and PCM WAV audio are parsed byte-by-byte
  * ([[MediaCodecs]]) and their features computed from actual
  * pixels/samples. Compressed formats (JPEG/MP3/H.264) would need
  * codec libraries this container doesn't have, so they fall back to
  * a deterministic byte-stat stub (clearly marked below). Everything
  * around the kernels is real and tested: the schema, the typed
  * Dataset plumbing, the mapPartitions batch shape (decode libraries
  * amortize per-partition init, exactly like a Pandas-UDF batch), and
  * the size-aware repartitioning that keeps a 100 TB blob scan
  * balanced when payload sizes are skewed.
  */
object Multimodal {

  case class Blob(doc_id: Long, payload: Array[Byte], width: Int, height: Int, format: String)
  case class Features(doc_id: Long, n_bytes: Int, features: Array[Double])
  case class Frame(doc_id: Long, frame_idx: Int, payload: Array[Byte])

  /** Stand-in media table: documents' text bytes as the payload, with
    * deterministic metadata (what an ingest job would carry alongside
    * real media).
    */
  def mediaTable(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents").select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      (col("n_chars") % 1024 + 1).cast("int").as("width"),
      (col("n_chars") % 768 + 1).cast("int").as("height"),
      lit("raw").as("format"))

  /** Partition-wise feature extraction over blobs. Dispatches on the
    * blob's declared format:
    *  - `ppm` → REAL binary-PPM decode ([[MediaCodecs.decodePpm]]):
    *    header parse + per-channel pixel statistics over actual RGB;
    *  - `wav` → REAL PCM-WAV decode ([[MediaCodecs.decodeWavPcm16]]):
    *    RIFF chunk walk + amplitude/zero-crossing stats over samples;
    *  - anything else, or a payload that fails its format's parse →
    *    the byte-stat STUB (compressed codecs don't exist in this
    *    container) — corrupt blobs degrade to byte features instead of
    *    killing the scan.
    * Codec-requiring formats would initialize their library once per
    * partition here (the mapPartitions shape exists for that).
    */
  def decodeFeatures(blobs: Dataset[Blob]): Dataset[Features] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions { it =>
      // per-partition init would go here (codec / model load)
      it.map { b =>
        val decoded: Option[Array[Double]] = b.format match {
          case "ppm" => MediaCodecs.decodePpm(b.payload).map(MediaCodecs.ppmFeatures)
          case "wav" => MediaCodecs.decodeWavPcm16(b.payload).map(MediaCodecs.wavFeatures)
          case _ => None
        }
        val feats = decoded.getOrElse(byteStatFeatures(b.payload))
        Features(b.doc_id, b.payload.length, feats)
      }
    }
  }

  /** Fallback kernel: deterministic byte statistics as an 8-dim
    * "feature" — the stand-in for formats whose decoder needs a codec
    * library, and the degraded path for corrupt payloads.
    */
  private def byteStatFeatures(bytes: Array[Byte]): Array[Double] = {
    val n = bytes.length
    val feats = new Array[Double](8)
    var i = 0
    while (i < n) {
      feats(i % 8) += (bytes(i) & 0xff) / 255.0
      i += 1
    }
    feats.map(_ / math.max(n / 8, 1))
  }

  /** "Resize": deterministic byte subsampling standing in for a pixel
    * resample — keeps every `factor`-th byte. The Spark shape (typed
    * map, schema preserved) is the real thing.
    */
  def resize(blobs: Dataset[Blob], factor: Int): Dataset[Blob] = {
    import blobs.sparkSession.implicits._
    blobs.map { b =>
      val out = b.payload.indices.collect { case i if i % factor == 0 => b.payload(i) }
      b.copy(payload = out.toArray,
        width = math.max(b.width / factor, 1), height = math.max(b.height / factor, 1))
    }
  }

  /** "Frame sampling": split a payload into fixed-size windows (1→N
    * rows, the video-frame extraction shape).
    */
  def sampleFrames(blobs: Dataset[Blob], frameBytes: Int, everyNth: Int): Dataset[Frame] = {
    import blobs.sparkSession.implicits._
    blobs.flatMap { b =>
      b.payload.grouped(frameBytes).zipWithIndex
        .collect { case (chunk, i) if i % everyNth == 0 => Frame(b.doc_id, i, chunk) }
    }
  }

  /** Spread a size-skewed blob table evenly across tasks. Range
    * partitioning BY size is the wrong tool here (it equalizes row
    * counts and concentrates all the large blobs into the top range —
    * maximal byte skew); a uniform hash of the id balances bytes in
    * expectation whenever each task holds many blobs, with residual
    * skew bounded by the single largest blob (which no row-level
    * partitioning can subdivide — oversized media needs chunking at
    * ingest, cf. [[sampleFrames]]).
    */
  def balanceBySize(df: DataFrame, partitions: Int): DataFrame =
    df.repartition(partitions, col("doc_id"))

  /** Oracle-checkable frame sampling: every `stride`-th fixed-size
    * window of each document's payload, with a digest per frame — the
    * video-frame-extraction shape (1→N generator) as a relational
    * query. Frames are cut on the character dimension so both engines
    * window identically; the binary-payload face of the same op is
    * [[sampleFrames]].
    */
  def frameSample(s: SparkSession, dir: String,
      frameChars: Int = 128, stride: Int = 2): DataFrame =
    Tables.load(s, dir, "documents")
      .select(col("doc_id"), col("text"),
        explode(sequence(lit(0),
          expr(s"greatest((length(text) + ${frameChars - 1}) div $frameChars, 1)").cast("int") - 1,
          lit(stride))).as("frame_idx"))
      .select(col("doc_id"), col("frame_idx"),
        md5(expr(s"substring(text, frame_idx * $frameChars + 1, $frameChars)")).as("frame_md5"),
        length(expr(s"substring(text, frame_idx * $frameChars + 1, $frameChars)")).as("frame_chars"))

  def frameSampleSql(frameChars: Int = 128, stride: Int = 2): String =
    s"""WITH f AS (
          SELECT doc_id, text,
                 unnest(range(0, greatest((length(text) + ${frameChars - 1}) // $frameChars, 1), $stride)) AS frame_idx
          FROM documents)
        SELECT doc_id, frame_idx,
               md5(substring(text, (frame_idx * $frameChars + 1)::INT, $frameChars)) AS frame_md5,
               length(substring(text, (frame_idx * $frameChars + 1)::INT, $frameChars)) AS frame_chars
        FROM f"""

  /** Oracle-checkable metadata/digest query over the media table. */
  def metaDigest(s: SparkSession, dir: String): DataFrame =
    mediaTable(s, dir).select(
      col("doc_id"),
      octet_length(col("payload")).as("n_bytes"),
      sha2(col("payload"), 256).as("sha256"),
      col("width"), col("height"), col("format"))

  val metaDigestSql: String =
    """SELECT doc_id,
          octet_length(encode(text)) AS n_bytes,
          sha256(text) AS sha256,
          (n_chars % 1024 + 1)::INT AS width,
          (n_chars % 768 + 1)::INT AS height,
          'raw' AS format
       FROM documents"""
}
