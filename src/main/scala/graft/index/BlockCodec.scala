package graft.index

import scala.collection.mutable.ArrayBuffer

/** Delta + 7-bit varint block codec for posting lists.
  *
  * The reference delta-codes docIDs per skip batch and positions per
  * posting, then RVL-compresses with 7-bit varints
  * (reference: src/IndexWriter.cpp:610-631,
  * src/DiskDocListIterator.cpp:277-295,
  * contrib/lemur/src/RVLCompress.cpp). Same scheme here: high bit set on
  * the terminating byte of each value (RVL convention), values are
  * non-negative deltas.
  */
object BlockCodec {

  /** Varint-encode one non-negative Long into the buffer.
    * RVL convention: 7 bits per byte, little-endian groups, high bit
    * marks the LAST byte of a value.
    */
  @inline private def writeVarint(buf: ArrayBuffer[Byte], value: Long): Unit = {
    var v = value
    require(v >= 0, s"varint value must be non-negative: $v")
    while (v >= 0x80L) {
      buf += (v & 0x7fL).toByte
      v >>>= 7
    }
    buf += ((v & 0x7fL) | 0x80L).toByte
  }

  /** Encode raw values with delta coding (first value stored verbatim). */
  def encodeDeltas(values: Array[Long]): Array[Byte] = {
    val buf = new ArrayBuffer[Byte](values.length * 2)
    var prev = 0L
    var i = 0
    while (i < values.length) {
      writeVarint(buf, values(i) - prev)
      prev = values(i)
      i += 1
    }
    buf.toArray
  }

  /** Encode values verbatim (no delta) — used for tf runs. */
  def encodePlain(values: Array[Long]): Array[Byte] = {
    val buf = new ArrayBuffer[Byte](values.length * 2)
    var i = 0
    while (i < values.length) {
      writeVarint(buf, values(i))
      i += 1
    }
    buf.toArray
  }

  def decodeDeltas(bytes: Array[Byte], n: Int): Array[Long] = {
    val out = new Array[Long](n)
    var prev = 0L
    var off = 0
    var i = 0
    while (i < n) {
      var v = 0L
      var shift = 0
      var done = false
      while (!done) {
        val b = bytes(off); off += 1
        v |= (b & 0x7fL) << shift
        shift += 7
        done = (b & 0x80) != 0
      }
      prev += v
      out(i) = prev
      i += 1
    }
    out
  }

  def decodePlain(bytes: Array[Byte], n: Int): Array[Long] = {
    val out = new Array[Long](n)
    var off = 0
    var i = 0
    while (i < n) {
      var v = 0L
      var shift = 0
      var done = false
      while (!done) {
        val b = bytes(off); off += 1
        v |= (b & 0x7fL) << shift
        shift += 7
        done = (b & 0x80) != 0
      }
      out(i) = v
      i += 1
    }
    out
  }

  /** Encode per-posting position lists: for each posting, positions are
    * delta-coded within the posting (reference: positions delta per
    * posting, src/IndexWriter.cpp:620-629). Layout per posting:
    * varint(count), then count delta-varints.
    */
  def encodePositions(positionLists: Array[Array[Int]]): Array[Byte] = {
    val buf = new ArrayBuffer[Byte](positionLists.length * 4)
    var i = 0
    while (i < positionLists.length) {
      val ps = positionLists(i)
      writeVarint(buf, ps.length.toLong)
      var prev = 0L
      var j = 0
      while (j < ps.length) {
        writeVarint(buf, ps(j).toLong - prev)
        prev = ps(j).toLong
        j += 1
      }
      i += 1
    }
    buf.toArray
  }

  def decodePositions(bytes: Array[Byte], nPostings: Int): Array[Array[Int]] = {
    val out = new Array[Array[Int]](nPostings)
    var off = 0
    @inline def readVarint(): Long = {
      var v = 0L
      var shift = 0
      var done = false
      while (!done) {
        val b = bytes(off); off += 1
        v |= (b & 0x7fL) << shift
        shift += 7
        done = (b & 0x80) != 0
      }
      v
    }
    var i = 0
    while (i < nPostings) {
      val cnt = readVarint().toInt
      val ps = new Array[Int](cnt)
      var prev = 0L
      var j = 0
      while (j < cnt) {
        prev += readVarint()
        ps(j) = prev.toInt
        j += 1
      }
      out(i) = ps
      i += 1
    }
    out
  }

  /** Shift every decoded value of a delta stream by a constant, WITHOUT
    * decoding the stream: the first value is stored verbatim as the
    * first delta (prev = 0), so adding `base` to it shifts the whole
    * reconstructed sequence while every later delta stays byte-identical.
    * O(first-varint) per block — this is how federation rebases a
    * member repository's docId blocks onto its documentBase (reference:
    * the per-index document base offset, include/indri/Index.hpp
    * documentBase(); DiskIndex.cpp returns local ids + base).
    */
  def rebaseDeltas(bytes: Array[Byte], base: Long): Array[Byte] = {
    if (bytes.isEmpty) return bytes
    if (base == 0L) return bytes
    var off = 0
    var first = 0L
    var shift = 0
    var done = false
    while (!done) {
      val b = bytes(off); off += 1
      first |= (b & 0x7fL) << shift
      shift += 7
      done = (b & 0x80) != 0
    }
    val buf = new ArrayBuffer[Byte](bytes.length + 2)
    writeVarint(buf, first + base)
    var i = off
    while (i < bytes.length) { buf += bytes(i); i += 1 }
    buf.toArray
  }
}
