package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Multimodal
import graft.sources.Tables

/** Audio fingerprint family (Multimodal.audioFingerprints /
  * audioNearDup): the per-window signature against an INDEPENDENT
  * in-memory byte-walk reference on the whole sf0.001 corpus, plus
  * closed-form planted fixtures for the aligned-delta matching rule —
  * including a 73-byte rotation that shifts every fingerprint by
  * exactly one window (delta = 1), exercising the Shazam offset
  * histogram off the trivial delta-0 diagonal.
  */
class AudioFingerprintSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def docs = Tables.documents(spark, sf)

  /** Independent fingerprint reference: raw UTF-8 payload bytes,
    * window w's sample s = byte (w*73 + s*7) mod n, bit (gy*8+gx) set
    * iff sample(gy*9+gx+1) > sample(gy*9+gx).
    */
  private def refFps(docId: Long, text: String): Seq[(Long, Long, Long, Long)] = {
    val bytes = text.getBytes("UTF-8")
    val n = bytes.length.toLong
    val durationMs = n * 37 % 50000 + 1000
    val nWindows = (durationMs + 9999) / 10000
    (0L until nWindows).map { w =>
      def sample(s: Int): Int =
        if (n == 0) 0 else bytes(((w * 73 + s * 7) % n).toInt) & 0xff
      var fp = 0L
      for (i <- 0 until 64) {
        val s = (i / 8) * 9 + (i % 8)
        if (sample(s + 1) > sample(s)) fp |= 1L << i
      }
      (docId, nWindows, w, fp)
    }
  }

  test("fingerprints match the independent byte-walk reference on sf0.001") {
    val corpus = docs.select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    val expected = corpus.flatMap { case (id, t) => refFps(id, t) }
      .sortBy(r => (r._1, r._3))
    val got = Multimodal.audioFingerprints(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got.size === expected.size)
    assert(got === expected)
  }

  private def df(rows: Seq[(Long, String)]) =
    rows.map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")

  // a payload long enough for several windows, APERIODIC bytes (an
  // LCG — a patterned payload makes distinct windows' fingerprints
  // collide and pollutes the diagonal counts)
  private val payloadA: String = {
    var x = 1L
    (0 until 700).map { _ =>
      x = x * 6364136223846793005L + 1442695040888963407L
      ('a' + (((x >>> 33) % 26).toInt)).toChar
    }.mkString
  }

  test("identical payloads pair with full alignment at delta 0") {
    val a = payloadA
    val other = (0 until 650).map(i => ('A' + (i * 11) % 26).toChar).mkString
    val fixture = df(Seq(1L -> a, 2L -> a, 3L -> other))
    val nw = refFps(1L, a).head._2
    val got = Multimodal.audioNearDup(fixture).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq === Seq((1L, 2L, nw, nw, 0L)),
      "the identical pair aligns every window at delta 0; the unrelated doc pairs with nothing")
  }

  test("a 73-byte rotation matches at delta 1 (the off-diagonal landmark vote)") {
    // B[i] = A[(i+73) mod n]: window w of B samples exactly window w+1
    // of A, so fingerprints match on the delta = wa - wb = 1 diagonal.
    val a = payloadA
    val bytes = a.getBytes("UTF-8")
    val b = new String((0 until bytes.length)
      .map(i => bytes((i + 73) % bytes.length)).toArray.map(_.toChar))
    val fixture = df(Seq(1L -> a, 2L -> b))
    val nw = refFps(1L, a).head._2
    val got = Multimodal.audioNearDup(fixture).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3), r.getLong(4)))
    assert(got.toSeq === Seq((1L, 2L, nw - 1, 1L)),
      "k-1 aligned windows on the delta-1 diagonal")
  }

  test("minAligned gates the vote; empty payload fingerprints to zero without a throw") {
    val a = payloadA
    val fixture = df(Seq(1L -> a, 2L -> a, 3L -> ""))
    // empty payload: one window (duration stub floor), fp 0
    val fps = Multimodal.audioFingerprints(fixture)
      .filter(col("doc_id") === 3L).collect()
    assert(fps.map(r => (r.getLong(2), r.getLong(3))).toSeq === Seq((0L, 0L)))
    // raising minAligned above the window count suppresses the pair
    val nw = refFps(1L, a).head._2
    assert(Multimodal.audioNearDup(fixture, minAligned = nw.toInt + 1).count() === 0L)
  }
}
