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
  * The DECODE STEP IS A STUB: no image/audio libraries exist in this
  * environment, so `decode*` produce deterministic fake features derived
  * from the raw bytes (documented per method). Schema, partitioning,
  * batch iteration, and column contracts are real and tested — swapping
  * the stub for an actual decoder is a one-function change.
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
