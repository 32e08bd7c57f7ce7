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
  * Decode status: `decodeWav` (RIFF/WAVE PCM-16), `decodeBmp` (BMP
  * 24bpp uncompressed) and `decodePng` (PNG 8-bit RGB/RGBA — zlib
  * inflates with JDK java.util.zip, all five scanline filters inverted)
  * are REAL decoders needing no external codec; oracled by
  * q_multimodal_wav / q_multimodal_bmp / q_multimodal_png against
  * arithmetically-recomputed features. JPEG (and any format the JRE
  * registers) decodes for real through the JDK's own ImageIO codec
  * (`decodeImageIO`, q_multimodal_jpeg). Only audio/video codec formats
  * (mp3/h264) have no libraries in this environment, so
  * `decodeFeatures`/`frameSample`/`resize` remain deterministic
  * byte-level STUBS (documented per method): schema, partitioning,
  * batch iteration, and column contracts are real and tested — swapping
  * a stub for an actual codec is a one-function change.
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
    // fail at the driver, not per-row on executors (Range.by(0) throws;
    // a negative stride silently yields zero frames for every row)
    require(stride > 0, s"frameSample stride must be positive, got $stride")
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
      // a negative (overflowing) le32 length is malformed: advancing by
      // it would loop forever (len = -8 advances 0) or walk backwards —
      // bail to the documented sentinel row instead
      if (len < 0) return None
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
      // word-aligned chunk walk in LONG arithmetic: a large positive len
      // ends the walk (truncated final chunk), never wraps `off` negative
      val next = off.toLong + 8L + len.toLong + (len & 1)
      off = if (next > b.length.toLong) b.length else next.toInt
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

  /** REAL image decode: BMP 24bpp uncompressed (BITMAPINFOHEADER)
    * parser — BMP is self-describing like WAV, so no codec library is
    * needed; compressed image formats (jpeg/png) remain the documented
    * stub. Output per row: (id, width, height, n_pixels, mean_r,
    * mean_g, mean_b); undecodable payloads → width -1 row (kept, so bad
    * rows are observable).
    */
  def decodeBmp(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("id", "media").mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        parseBmp(r.getAs[Array[Byte]](1)) match {
          case Some((w, h, px)) =>
            var sr = 0L; var sg = 0L; var sb = 0L
            var i = 0
            while (i < px.length) {
              sr += (px(i) >> 16) & 0xff; sg += (px(i) >> 8) & 0xff; sb += px(i) & 0xff
              i += 1
            }
            val n = px.length.toLong
            def mean(s: Long): Double =
              if (n == 0) 0.0
              else BigDecimal(s / n.toDouble)
                .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
            (id, w, h, n, mean(sr), mean(sg), mean(sb))
          case None => (id, -1, -1, 0L, 0.0, 0.0, 0.0)
        }
      }
    }.toDF("id", "width", "height", "n_pixels", "mean_r", "mean_g", "mean_b")
  }

  /** 24bpp BI_RGB BMP parser: (width, height, pixels 0xRRGGBB row-major
    * TOP-DOWN). Handles both bottom-up (positive height) and top-down
    * (negative height) row order and the 4-byte row padding.
    */
  def parseBmp(b: Array[Byte]): Option[(Int, Int, Array[Int])] = {
    @inline def le16(o: Int): Int = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
    @inline def le32(o: Int): Int =
      (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) | ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
    if (b.length < 54 || b(0) != 'B'.toByte || b(1) != 'M'.toByte) return None
    val dataOff = le32(10)
    if (le32(14) < 40) return None // BITMAPINFOHEADER or longer
    val w = le32(18); val hRaw = le32(22)
    val bottomUp = hRaw > 0
    val h = math.abs(hRaw)
    if (le16(26) != 1 || le16(28) != 24 || le32(30) != 0 || w <= 0 || h == 0) return None
    // bounds in LONG arithmetic: an adversarial width (w·3 wrapping
    // negative) must fail the check, not pass it and then crash/OOM on
    // the pixel allocation below
    val rowBytesL = ((w.toLong * 3L + 3L) / 4L) * 4L
    if (dataOff < 0 || dataOff.toLong + rowBytesL * h.toLong > b.length.toLong) return None
    val rowBytes = rowBytesL.toInt // ≤ b.length after the check
    val px = new Array[Int](w * h) // w·h ≤ b.length/3 after the check
    var y = 0
    while (y < h) {
      val srcRow = if (bottomUp) h - 1 - y else y
      val ro = dataOff + srcRow * rowBytes
      var x = 0
      while (x < w) {
        val o = ro + x * 3 // BGR on disk
        px(y * w + x) = ((b(o + 2) & 0xff) << 16) | ((b(o + 1) & 0xff) << 8) | (b(o) & 0xff)
        x += 1
      }
      y += 1
    }
    Some((w, h, px))
  }

  /** Synthesize a 24bpp bottom-up BMP from row-major top-down 0xRRGGBB
    * pixels — the test/oracle harness for decodeBmp.
    */
  def synthBmpBytes(w: Int, h: Int, px: Array[Int]): Array[Byte] = {
    val rowBytes = ((w * 3 + 3) / 4) * 4
    val dataLen = rowBytes * h
    val out = java.nio.ByteBuffer.allocate(54 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put('B'.toByte).put('M'.toByte).putInt(54 + dataLen).putInt(0).putInt(54)
    out.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24).putInt(0)
      .putInt(dataLen).putInt(2835).putInt(2835).putInt(0).putInt(0)
    var y = h - 1
    while (y >= 0) {
      var x = 0
      while (x < w) {
        val p = px(y * w + x)
        out.put((p & 0xff).toByte).put(((p >> 8) & 0xff).toByte)
          .put(((p >> 16) & 0xff).toByte)
        x += 1
      }
      var pad = rowBytes - w * 3
      while (pad > 0) { out.put(0.toByte); pad -= 1 }
      y -= 1
    }
    out.array()
  }

  /** REAL image decode #2: PNG (8-bit RGB/RGBA, non-interlaced) — the
    * zlib stream inflates with JDK `java.util.zip`, so no external codec
    * is needed; all five scanline filters (None/Sub/Up/Average/Paeth)
    * are inverted. Same output shape as decodeBmp; undecodable → width
    * -1 row.
    */
  def decodePng(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("id", "media").mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        parsePng(r.getAs[Array[Byte]](1)) match {
          case Some((w, h, px)) =>
            var sr = 0L; var sg = 0L; var sb = 0L
            var i = 0
            while (i < px.length) {
              sr += (px(i) >> 16) & 0xff; sg += (px(i) >> 8) & 0xff; sb += px(i) & 0xff
              i += 1
            }
            val n = px.length.toLong
            def mean(s: Long): Double =
              if (n == 0) 0.0
              else BigDecimal(s / n.toDouble)
                .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
            (id, w, h, n, mean(sr), mean(sg), mean(sb))
          case None => (id, -1, -1, 0L, 0.0, 0.0, 0.0)
        }
      }
    }.toDF("id", "width", "height", "n_pixels", "mean_r", "mean_g", "mean_b")
  }

  private val PngSig: Array[Byte] =
    Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** PNG parser: 8-bit colorType 2 (RGB) / 6 (RGBA, alpha dropped),
    * interlace 0. Returns (width, height, pixels 0xRRGGBB row-major
    * top-down). Chunk CRCs are not verified (tolerant read).
    */
  def parsePng(b: Array[Byte]): Option[(Int, Int, Array[Int])] = {
    if (b.length < 8) return None
    var i = 0
    while (i < 8) { if (b(i) != PngSig(i)) return None; i += 1 }
    @inline def be32(o: Int): Int =
      ((b(o) & 0xff) << 24) | ((b(o + 1) & 0xff) << 16) | ((b(o + 2) & 0xff) << 8) | (b(o + 3) & 0xff)
    var off = 8
    var w = -1; var h = -1; var bitDepth = -1; var colorType = -1
    val idat = new java.io.ByteArrayOutputStream()
    var done = false
    while (!done && off + 8 <= b.length) {
      val len = be32(off)
      val typ = new String(b, off + 4, 4, "US-ASCII")
      // LONG arithmetic: a len near 2^31 wraps the int sum negative and
      // would pass the bound, then crash on the IDAT copy
      if (len < 0 || off.toLong + 8L + len.toLong + 4L > b.length.toLong) return None
      typ match {
        case "IHDR" =>
          if (len < 13) return None
          w = be32(off + 8); h = be32(off + 12)
          bitDepth = b(off + 16) & 0xff; colorType = b(off + 17) & 0xff
          if ((b(off + 18) & 0xff) != 0 || (b(off + 19) & 0xff) != 0 ||
              (b(off + 20) & 0xff) != 0) return None // compression/filter/interlace
        case "IDAT" => idat.write(b, off + 8, len)
        case "IEND" => done = true
        case _ => () // ancillary chunks skipped
      }
      off += 12 + len
    }
    if (w <= 0 || h <= 0 || bitDepth != 8 || (colorType != 2 && colorType != 6)) return None
    val bpp = if (colorType == 2) 3 else 4
    // header-claimed decoded size must be allocatable AND plausible:
    // zlib expands at most ~1032:1, so a tiny IDAT claiming a multi-GB
    // image is malformed (an unchecked w·h would wrap the array size
    // negative or OOM the executor on a few-KB adversarial payload)
    val needL = (w.toLong * bpp + 1L) * h.toLong
    if (needL > Int.MaxValue.toLong - 8L ||
        needL > idat.size().toLong * 1032L + 64L) return None
    val stride = w * bpp
    val raw = new Array[Byte]((stride + 1) * h)
    val inf = new java.util.zip.Inflater()
    inf.setInput(idat.toByteArray)
    var got = 0
    try {
      while (got < raw.length && !inf.finished()) {
        val n = inf.inflate(raw, got, raw.length - got)
        if (n == 0 && (inf.needsInput() || inf.needsDictionary())) return None
        got += n
      }
    } catch { case _: java.util.zip.DataFormatException => return None }
    finally inf.end()
    if (got < raw.length) return None
    // invert the per-row filter (spec: None/Sub/Up/Average/Paeth over
    // the UNFILTERED bytes of this and the previous row)
    val out = new Array[Byte](stride * h)
    var y = 0
    while (y < h) {
      val ft = raw(y * (stride + 1)) & 0xff
      val ro = y * (stride + 1) + 1
      val oo = y * stride
      var x = 0
      while (x < stride) {
        val rv = raw(ro + x) & 0xff
        val a = if (x >= bpp) out(oo + x - bpp) & 0xff else 0
        val up = if (y > 0) out(oo - stride + x) & 0xff else 0
        val c = if (x >= bpp && y > 0) out(oo - stride + x - bpp) & 0xff else 0
        val v = ft match {
          case 0 => rv
          case 1 => rv + a
          case 2 => rv + up
          case 3 => rv + ((a + up) >> 1)
          case 4 =>
            val p = a + up - c
            val pa = math.abs(p - a); val pb = math.abs(p - up); val pc = math.abs(p - c)
            rv + (if (pa <= pb && pa <= pc) a else if (pb <= pc) up else c)
          case _ => return None
        }
        out(oo + x) = (v & 0xff).toByte
        x += 1
      }
      y += 1
    }
    val px = new Array[Int](w * h)
    var j = 0
    while (j < w * h) {
      val o = j * bpp
      px(j) = ((out(o) & 0xff) << 16) | ((out(o + 1) & 0xff) << 8) | (out(o + 2) & 0xff)
      j += 1
    }
    Some((w, h, px))
  }

  /** Synthesize an 8-bit RGB PNG from row-major 0xRRGGBB pixels, every
    * row encoded with `filterType` (0-4; predictors computed from the
    * unfiltered data exactly as the spec's encoder side) — the
    * test/oracle harness for parsePng, and a filter-coverage vector
    * generator.
    */
  def synthPngBytes(w: Int, h: Int, px: Array[Int], filterType: Int = 0): Array[Byte] = {
    require(filterType >= 0 && filterType <= 4)
    val bpp = 3
    val stride = w * bpp
    val plain = new Array[Byte](stride * h)
    var j = 0
    while (j < w * h) {
      val p = px(j); val o = j * bpp
      plain(o) = ((p >> 16) & 0xff).toByte
      plain(o + 1) = ((p >> 8) & 0xff).toByte
      plain(o + 2) = (p & 0xff).toByte
      j += 1
    }
    val raw = new Array[Byte]((stride + 1) * h)
    var y = 0
    while (y < h) {
      raw(y * (stride + 1)) = filterType.toByte
      var x = 0
      while (x < stride) {
        val oo = y * stride + x
        val cur = plain(oo) & 0xff
        val a = if (x >= bpp) plain(oo - bpp) & 0xff else 0
        val up = if (y > 0) plain(oo - stride) & 0xff else 0
        val c = if (x >= bpp && y > 0) plain(oo - stride - bpp) & 0xff else 0
        val f = filterType match {
          case 0 => cur
          case 1 => cur - a
          case 2 => cur - up
          case 3 => cur - ((a + up) >> 1)
          case 4 =>
            val p = a + up - c
            val pa = math.abs(p - a); val pb = math.abs(p - up); val pc = math.abs(p - c)
            cur - (if (pa <= pb && pa <= pc) a else if (pb <= pc) up else c)
        }
        raw(y * (stride + 1) + 1 + x) = (f & 0xff).toByte
        x += 1
      }
      y += 1
    }
    val defl = new java.util.zip.Deflater()
    defl.setInput(raw); defl.finish()
    val comp = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!defl.finished()) comp.write(buf, 0, defl.deflate(buf))
    defl.end()
    def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
      val cb = java.nio.ByteBuffer.allocate(12 + data.length) // big-endian
      cb.putInt(data.length).put(typ.getBytes("US-ASCII")).put(data)
      val crc = new java.util.zip.CRC32()
      crc.update(typ.getBytes("US-ASCII")); crc.update(data)
      cb.putInt(crc.getValue.toInt)
      cb.array()
    }
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(w).putInt(h).put(8.toByte).put(2.toByte)
      .put(0.toByte).put(0.toByte).put(0.toByte).array()
    val bos = new java.io.ByteArrayOutputStream()
    bos.write(PngSig)
    bos.write(chunk("IHDR", ihdr))
    bos.write(chunk("IDAT", comp.toByteArray))
    bos.write(chunk("IEND", Array.emptyByteArray))
    bos.toByteArray
  }

  /** REAL compressed-image decode via the JDK's own ImageIO
    * (java.desktop module — present in stock JDKs, no EXTERNAL codec):
    * JPEG/GIF/TIFF plus anything the JRE registers. Same feature shape
    * as decodeBmp/decodePng. The hand-rolled parseBmp/parsePng remain
    * the default image path (no java.desktop requirement on executors);
    * ImageIO also serves as the reference implementation the hand
    * parsers are cross-validated against (AuxOpsSpec).
    */
  def decodeImageIO(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("id", "media").mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        val img =
          try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
          catch { case _: Exception => null }
        if (img == null) (id, -1, -1, 0L, 0.0, 0.0, 0.0)
        else {
          val w = img.getWidth; val h = img.getHeight
          var sr = 0L; var sg = 0L; var sb = 0L
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val p = img.getRGB(x, y)
              sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
              x += 1
            }
            y += 1
          }
          val n = w.toLong * h
          def mean(s: Long): Double =
            if (n == 0) 0.0
            else BigDecimal(s / n.toDouble)
              .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
          (id, w, h, n, mean(sr), mean(sg), mean(sb))
        }
      }
    }.toDF("id", "width", "height", "n_pixels", "mean_r", "mean_g", "mean_b")
  }

  /** Encode a solid-color JPEG via ImageIO — the harness for the JPEG
    * driver query (JPEG is lossy, so the oracle checks the lossless
    * metadata columns; pixel tolerance is pinned in AuxOpsSpec).
    */
  def synthJpegBytes(w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, rgb); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    bos.toByteArray
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
