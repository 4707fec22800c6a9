package graft

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random
import graft.codec.{PostingsCodec, SmallFloat}

class SmallFloatSpec extends AnyFunSuite {

  test("exact below the free-value threshold") {
    for (i <- 0 until SmallFloat.NumFreeValues)
      assert(SmallFloat.byte4ToInt(SmallFloat.intToByte4(i)) == i)
  }

  test("quantization rounds down and is monotone") {
    var prev = -1
    for (i <- 0 to 2000000 by 7) {
      val d = SmallFloat.byte4ToInt(SmallFloat.intToByte4(i))
      assert(d <= i, s"decode($i) = $d must round down")
      assert(d >= prev, s"monotonicity violated at $i")
      prev = d
    }
  }

  test("idempotent: re-encoding a decoded value is stable (seeded sweep)") {
    val rnd = new Random(42)
    for (_ <- 0 until 20000) {
      val i = rnd.nextInt(Int.MaxValue)
      val once = SmallFloat.byte4ToInt(SmallFloat.intToByte4(i))
      val twice = SmallFloat.byte4ToInt(SmallFloat.intToByte4(once))
      assert(once == twice)
    }
  }

  test("256 distinct representable lengths, ascending") {
    val t = SmallFloat.lengthTable
    assert(t.length == 256)
    assert(t.toSeq == t.toSeq.sorted)
    assert(t.distinct.length == 256)
  }
}

class CodecSpec extends AnyFunSuite {

  private def randomPostings(rnd: Random, n: Int): (Array[Long], Array[Int], Array[Byte]) = {
    val docs = new Array[Long](n)
    var cur = 10L
    for (i <- 0 until n) { cur += 1 + rnd.nextInt(5000); docs(i) = cur }
    val tfs = Array.fill(n)(1 + rnd.nextInt(300))
    val norms = Array.fill(n)(rnd.nextInt(256).toByte)
    (docs, tfs, norms)
  }

  test("varint round-trip") {
    val rnd = new Random(7)
    for (_ <- 0 until 200) {
      val vs = List.fill(rnd.nextInt(50))(rnd.nextLong(Long.MaxValue / 2))
      val buf = scala.collection.mutable.ArrayBuffer.empty[Byte]
      vs.foreach(PostingsCodec.writeVLong(_, buf))
      val out = new Array[Long](vs.length)
      PostingsCodec.readVLongs(buf.toArray, vs.length, out)
      assert(out.toSeq == vs)
    }
  }

  test("encode/decode round-trip, block invariants") {
    val rnd = new Random(11)
    for (_ <- 0 until 120) {
      val (docs, tfs, norms) = randomPostings(rnd, 1 + rnd.nextInt(600))
      val blocks = PostingsCodec.encode(docs, tfs, norms)
      blocks.dropRight(1).foreach(b => assert(b.count == PostingsCodec.BlockSize))
      assert(blocks.last.count <= PostingsCodec.BlockSize)
      var off = 0
      blocks.foreach { b =>
        val tfSlice = tfs.slice(off, off + b.count)
        val nSlice = norms.slice(off, off + b.count).map(java.lang.Byte.toUnsignedInt)
        assert(b.max_tf == tfSlice.max)
        assert(java.lang.Byte.toUnsignedInt(b.min_norm) == nSlice.min)
        assert(b.first_doc == docs(off))
        assert(b.last_doc == docs(off + b.count - 1))
        off += b.count
      }
      val (d2, t2) = PostingsCodec.decode(blocks)
      assert(d2.toSeq == docs.toSeq)
      assert(t2.toSeq == tfs.toSeq)
    }
  }

  test("merge(A,B) over split doc ranges == encode(A ++ B), byte-for-byte") {
    val rnd = new Random(13)
    for (_ <- 0 until 120) {
      val (docs, tfs, norms) = randomPostings(rnd, 2 + rnd.nextInt(600))
      val cut = 1 + rnd.nextInt(docs.length - 1)
      val normOf = docs.zip(norms).toMap
      val a = PostingsCodec.encode(docs.take(cut), tfs.take(cut), norms.take(cut))
      val b = PostingsCodec.encode(docs.drop(cut), tfs.drop(cut), norms.drop(cut))
      val merged = PostingsCodec.merge(a, b, normOf)
      val direct = PostingsCodec.encode(docs, tfs, norms)
      assert(merged.length == direct.length)
      merged.zip(direct).foreach { case (m, d) =>
        assert(m.first_doc == d.first_doc && m.last_doc == d.last_doc &&
          m.count == d.count && m.max_tf == d.max_tf && m.min_norm == d.min_norm)
        assert(m.gaps.toSeq == d.gaps.toSeq)
        assert(m.tfs.toSeq == d.tfs.toSeq)
      }
    }
  }

  test("merge of mixed positional/position-less inputs drops positions instead of misaligning") {
    val docsA = Array(1L, 4L); val docsB = Array(2L, 5L)
    val tfsA = Array(2, 1); val tfsB = Array(1, 3)
    val nA = Array[Byte](1, 2); val nB = Array[Byte](3, 4)
    val normOf = (docsA.zip(nA) ++ docsB.zip(nB)).toMap
    val withPos = PostingsCodec.encode(docsA, tfsA, nA, Array(Array(0, 5), Array(2)))
    val bare = PostingsCodec.encode(docsB, tfsB, nB)
    // either argument order: must not throw, must decode correctly, no positions
    for ((x, y) <- Seq((withPos, bare), (bare, withPos))) {
      val m = PostingsCodec.merge(x, y, normOf)
      val (d, t) = PostingsCodec.decode(m)
      assert(d.toSeq == Seq(1L, 2L, 4L, 5L))
      assert(t.toSeq == Seq(2, 1, 1, 3))
      m.foreach(b => assert(PostingsCodec.decodePositions(b).isEmpty))
    }
    // both positional: positions survive, aligned
    val bPos = PostingsCodec.encode(docsB, tfsB, nB, Array(Array(1), Array(0, 3, 9)))
    val m2 = PostingsCodec.merge(withPos, bPos, normOf)
    val ps = m2.flatMap(PostingsCodec.decodePositions)
    assert(ps.map(_.toSeq).toSeq == Seq(Seq(0, 5), Seq(1), Seq(2), Seq(0, 3, 9)))
  }

  test("merge with interleaved (still disjoint) doc ids") {
    val docsA = Array(1L, 4L, 9L, 100L)
    val docsB = Array(2L, 5L, 50L, 600L)
    val tfsA = Array(1, 2, 3, 4); val tfsB = Array(5, 6, 7, 8)
    val nA = Array[Byte](1, 2, 3, 4); val nB = Array[Byte](5, 6, 7, 8)
    val normOf = (docsA.zip(nA) ++ docsB.zip(nB)).toMap
    val m = PostingsCodec.merge(
      PostingsCodec.encode(docsA, tfsA, nA),
      PostingsCodec.encode(docsB, tfsB, nB), normOf)
    val (d, t) = PostingsCodec.decode(m)
    assert(d.toSeq == Seq(1L, 2L, 4L, 5L, 9L, 50L, 100L, 600L))
    assert(t.toSeq == Seq(1, 5, 2, 6, 3, 7, 4, 8))
  }
}
