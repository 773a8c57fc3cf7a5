package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** ISO-BMFF container structure: build → parse round-trips the movie
  * header timing, track geometry, and mdat payload; hostile bytes
  * degrade to None (the decode hot path must never throw). */
class Mp4Spec extends AnyFunSuite {

  test("build → parse round-trips timing, geometry, payload") {
    val payload = "coded-frames-stand-in".getBytes("UTF-8")
    val bytes = Mp4.build(timescale = 30000, duration = 901, width = 1920, height = 1080, payload)
    val info = Mp4.parse(bytes).getOrElse(fail("valid container must parse"))
    assert(info.timescale == 30000 && info.duration == 901L)
    assert(info.width == 1920 && info.height == 1080)
    assert(info.mdat.toSeq == payload.toSeq, "mdat payload must round-trip byte-exact")
  }

  test("box layout is structurally valid (sizes chain to EOF, ftyp leads)") {
    val bytes = Mp4.build(1000, 24, 320, 180, Array[Byte](1, 2, 3))
    // walk top-level boxes by declared size: must land exactly on EOF
    var p = 0
    val seen = Seq.newBuilder[String]
    while (p + 8 <= bytes.length) {
      val size = java.nio.ByteBuffer.wrap(bytes, p, 4).getInt
      seen += new String(bytes, p + 4, 4, "US-ASCII")
      assert(size >= 8, "box size must include its header")
      p += size
    }
    assert(p == bytes.length, "box sizes must chain exactly to EOF")
    assert(seen.result() == Seq("ftyp", "moov", "mdat"))
  }

  test("hostile bytes parse to None, never throw") {
    assert(Mp4.parse(Array.emptyByteArray).isEmpty)
    assert(Mp4.parse("not an mp4 at all, just text".getBytes).isEmpty)
    val valid = Mp4.build(1000, 24, 320, 180, Array[Byte](9))
    assert(Mp4.parse(valid.take(20)).isEmpty, "truncated mid-moov must be None")
    // size field pointing past EOF
    val overflow = valid.clone()
    overflow(0) = 0x7F.toByte
    assert(Mp4.parse(overflow).isEmpty)
    // a moov with no mvhd inside
    val bare = {
      val moov = java.nio.ByteBuffer.allocate(8).putInt(8).put("moov".getBytes).array()
      moov
    }
    assert(Mp4.parse(bare).isEmpty)
  }

  test("decode dispatch fills video metadata from the real container parse") {
    val spark = graft.SparkTestSession.spark
    import spark.implicits._
    val docs = Seq((2L, "t2"), (5L, "t5")).toDF("doc_id", "text") // ids ≡ 2 mod 3 → video
    val byId = Multimodal.decode(Multimodal.synthesize(docs, "doc_id"))
      .select("media_id", "width", "height", "sample_rate", "n_samples")
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getInt(3), r.getLong(4)))).toMap
    Seq(2L, 5L).foreach { id =>
      val (tsc, dur, w, h) = Multimodal.videoParams(id)
      assert(byId(id) == ((w, h, tsc, dur.toLong)),
        s"id $id: container metadata must match the synthesized parameters")
    }
  }
}
