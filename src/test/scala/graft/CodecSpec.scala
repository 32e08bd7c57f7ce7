package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.index.BlockCodec

/** decode(encode(x)) == x round-trip properties (FIXTURES.md §3) —
  * seeded randomized property loops (100 cases each).
  */
class CodecSpec extends AnyFunSuite {
  private val Cases = 100

  test("delta varint round-trip on sorted docIds") {
    val rng = new scala.util.Random(42)
    (1 to Cases).foreach { _ =>
      val n = 1 + rng.nextInt(500)
      val xs = Array.fill(n)(math.abs(rng.nextLong()) % (1L << 40)).distinct.sorted
      val enc = BlockCodec.encodeDeltas(xs)
      assert(BlockCodec.decodeDeltas(enc, xs.length).toSeq == xs.toSeq)
    }
  }

  test("plain varint round-trip") {
    val rng = new scala.util.Random(43)
    (1 to Cases).foreach { _ =>
      val n = 1 + rng.nextInt(500)
      val xs = Array.fill(n)(math.abs(rng.nextLong()) % (Long.MaxValue / 2))
      val enc = BlockCodec.encodePlain(xs)
      assert(BlockCodec.decodePlain(enc, xs.length).toSeq == xs.toSeq)
    }
  }

  test("position lists round-trip (delta per posting)") {
    val rng = new scala.util.Random(44)
    (1 to Cases).foreach { _ =>
      val nP = 1 + rng.nextInt(50)
      val pls = Array.fill(nP)(Array.fill(1 + rng.nextInt(30))(rng.nextInt(1 << 20)).distinct.sorted)
      val enc = BlockCodec.encodePositions(pls)
      val dec = BlockCodec.decodePositions(enc, pls.length)
      assert(dec.length == pls.length)
      pls.indices.foreach(i => assert(dec(i).toSeq == pls(i).toSeq))
    }
  }

  test("edge cases: empty positions, zero, single, large values") {
    assert(BlockCodec.decodeDeltas(BlockCodec.encodeDeltas(Array(0L)), 1).toSeq == Seq(0L))
    assert(BlockCodec.decodeDeltas(BlockCodec.encodeDeltas(Array(Long.MaxValue / 4)), 1).head == Long.MaxValue / 4)
    val withEmpty = Array(Array.empty[Int], Array(5), Array(1, 2, 3))
    val dec = BlockCodec.decodePositions(BlockCodec.encodePositions(withEmpty), 3)
    assert(dec(0).isEmpty && dec(1).toSeq == Seq(5) && dec(2).toSeq == Seq(1, 2, 3))
  }

  test("varint compression is compact for small deltas") {
    val xs = (0L until 1000L).toArray // deltas of 1
    assert(BlockCodec.encodeDeltas(xs).length <= 1002)
  }
}
