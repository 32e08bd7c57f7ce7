package graft.pipeline

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video payloads ride as opaque
  * `binary` columns with a typed metadata struct; decode / feature /
  * resize / frame-sample stages run batch-wise over partitions so a real
  * codec (JNI/FFI or vectorized UDF) drops in without changing the
  * dataflow.
  *
  * Decode status: `decodeWav` is a REAL decoder (RIFF/WAVE PCM-16 is
  * self-describing — no codec library needed; oracled by q_multimodal_wav
  * against arithmetically-recomputed features). Compressed formats
  * (jpeg/mp3/h264) have no codec libraries in this environment, so
  * `decodeFeatures`/`frameSample`/`resize` remain deterministic
  * byte-level STUBS (documented per method): schema, partitioning, batch
  * iteration, and column contracts are real and tested — swapping a stub
  * for an actual codec is a one-function change.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("media", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("kind", StringType),     // image | audio | video
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("sampleRate", IntegerType))))))

  /** Wrap a text column as a binary media payload (test/bench harness —
    * real ingestion would read files/blobs directly).
    */
  def attach(df: DataFrame, idCol: String, payloadCol: String,
             kind: String = "image"): DataFrame =
    df.select(
      col(idCol).cast(LongType).as("id"),
      encode(col(payloadCol), "UTF-8").as("media"),
      struct(lit(kind).as("kind"), lit(0).as("width"), lit(0).as("height"),
        lit(0).as("sampleRate")).as("meta"))

  /** Deterministic byte-level features per media row:
    * (id, n_bytes, fp = md5 hex of the payload, head = first byte or -1).
    * STUB stands in for "decode then embed"; the mapPartitions batch
    * shape (one decoder init per partition, streamed rows) is the real
    * contract.
    */
  def decodeFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("id", "media").mapPartitions { rows =>
      // per-partition "decoder" init happens here (md5 instance reuse)
      val md = java.security.MessageDigest.getInstance("MD5")
      rows.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        md.reset()
        val fp = md.digest(bytes).map("%02x".format(_)).mkString
        (id, bytes.length.toLong, fp, if (bytes.nonEmpty) (bytes(0) & 0xff) else -1)
      }
    }.toDF("id", "n_bytes", "fp", "head")
  }

  /** Frame-sample stub: every `stride`-th byte is a "frame"; returns
    * (id, n_frames, frames = sampled bytes as ints). A real video path
    * would emit one row per decoded keyframe with the same shape.
    */
  def frameSample(media: DataFrame, stride: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("id", "media").mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        val frames = bytes.indices.by(stride).map(i => bytes(i) & 0xff).toArray
        (id, frames.length.toLong, frames)
      }
    }.toDF("id", "n_frames", "frames")
  }

  /** REAL audio decode: RIFF/WAVE PCM parser (chunk walk, little-endian
    * fmt + data chunks, 16-bit samples) — WAV is self-describing, so this
    * needs no codec library; compressed formats (jpeg/mp3/h264) remain
    * the documented stub. Output per row:
    * (id, sample_rate, channels, n_samples, mean_abs, peak); undecodable
    * payloads → sample_rate -1 row (kept, so bad rows are observable).
    */
  def decodeWav(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("id", "media").mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val b = r.getAs[Array[Byte]](1)
        parseWav(b) match {
          case Some((rate, ch, samples)) =>
            var sumAbs = 0L; var peak = 0L
            var i = 0
            while (i < samples.length) {
              val a = math.abs(samples(i).toLong)
              sumAbs += a; if (a > peak) peak = a
              i += 1
            }
            val mean = if (samples.isEmpty) 0.0
                       else BigDecimal(sumAbs / samples.length.toDouble)
                         .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
            (id, rate, ch, samples.length.toLong, mean, peak)
          case None => (id, -1, -1, 0L, 0.0, 0L)
        }
      }
    }.toDF("id", "sample_rate", "channels", "n_samples", "mean_abs", "peak")
  }

  /** RIFF/WAVE PCM-16 parser: returns (sampleRate, channels, samples). */
  def parseWav(b: Array[Byte]): Option[(Int, Int, Array[Short])] = {
    @inline def le16(o: Int): Int = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
    @inline def le32(o: Int): Int =
      (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) | ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
    @inline def tag(o: Int): String = new String(b, o, 4, "US-ASCII")
    if (b.length < 44 || tag(0) != "RIFF" || tag(8) != "WAVE") return None
    var off = 12
    var rate = -1; var ch = -1; var bits = -1
    var samples: Array[Short] = null
    while (off + 8 <= b.length) {
      val id = tag(off); val len = le32(off + 4)
      if (id == "fmt " && off + 8 + 16 <= b.length) {
        val fmt = le16(off + 8)
        ch = le16(off + 10); rate = le32(off + 12); bits = le16(off + 22)
        if (fmt != 1 || bits != 16) return None // PCM-16 only
      } else if (id == "data") {
        val n = math.min(len, b.length - off - 8) / 2
        samples = new Array[Short](n)
        var i = 0
        while (i < n) { samples(i) = le16(off + 8 + i * 2).toShort; i += 1 }
      }
      off += 8 + len + (len & 1) // chunks are word-aligned
    }
    if (rate < 0 || samples == null) None else Some((rate, ch, samples))
  }

  /** Synthesize a PCM-16 mono WAV payload from deterministic samples —
    * the test/oracle harness for decodeWav (the driver oracle recomputes
    * the expected features arithmetically from the same sample formula).
    */
  def synthWavBytes(samples: Array[Short], sampleRate: Int): Array[Byte] = {
    val dataLen = samples.length * 2
    val out = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1) // PCM, mono
      .putInt(sampleRate).putInt(sampleRate * 2)
      .putShort(2).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(out.putShort)
    out.array()
  }

  /** Resize stub: "resample" the byte payload to `targetLen` by nearest
    * index — the shape of an image resize (fixed output size per row).
    */
  def resize(media: DataFrame, targetLen: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("id", "media").mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        val out = new Array[Byte](targetLen)
        if (bytes.nonEmpty) {
          var i = 0
          while (i < targetLen) {
            out(i) = bytes(((i.toLong * bytes.length) / targetLen).toInt)
            i += 1
          }
        }
        (id, out)
      }
    }.toDF("id", "resized")
  }
}
