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
    assert(info.mdat(bytes).toSeq == payload.toSeq, "mdat payload must round-trip byte-exact")
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
    assert(Mp4.parse(valid.take(20)).isEmpty, "ftyp-only prefix has no moov: None")
    assert(Mp4.parse(valid.take(30)).isEmpty, "truncated mid-moov must be None")
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

  test("spec size encodings: largesize (size==1), to-EOF (size==0), unsigned v0 duration") {
    import java.nio.{ByteBuffer, ByteOrder}
    val base = Mp4.build(1000, 24, 320, 180, Array[Byte](7, 8, 9))
    // rewrite the trailing mdat as a size==1 + 64-bit largesize box
    val mdatAt = base.length - 11 // 8 hdr + 3 payload
    val pre = base.take(mdatAt)
    val large = ByteBuffer.allocate(19).order(ByteOrder.BIG_ENDIAN)
      .putInt(1).put("mdat".getBytes).putLong(19L).put(Array[Byte](7, 8, 9)).array()
    val withLarge = pre ++ large
    val li = Mp4.parse(withLarge).getOrElse(fail("largesize mdat must parse"))
    assert(li.mdat(withLarge).toSeq == Seq[Byte](7, 8, 9))
    // size==0: mdat extends to EOF
    val toEof = base.clone()
    ByteBuffer.wrap(toEof, mdatAt, 4).putInt(0)
    val ei = Mp4.parse(toEof).getOrElse(fail("to-EOF mdat must parse"))
    assert(ei.mdat(toEof).toSeq == Seq[Byte](7, 8, 9))
    // v0 duration beyond 2^31 must read unsigned, not negative
    val longDur = Mp4.build(90000, 0, 320, 180, Array.emptyByteArray)
    // patch mvhd duration field (content offset 16) to 0xF0000000
    val moovContent = 8 /*ftyp hdr*/ + 12 /*ftyp content*/ + 8 /*moov hdr*/ + 8 /*mvhd hdr*/
    ByteBuffer.wrap(longDur, moovContent + 16, 4).putInt(0xF0000000)
    val di = Mp4.parse(longDur).getOrElse(fail("patched container must parse"))
    assert(di.duration == 0xF0000000L && di.duration > 0, "unsigned 32-bit duration")
  }

  test("multi-track: geometry comes from the first trak with non-zero size") {
    // audio-style trak (0×0) FIRST, then the video trak — the common
    // muxed ordering; width/height must come from the video track
    val video = Mp4.build(1000, 24, 640, 360, Array.emptyByteArray)
    // extract the video trak box from the built container and build a
    // moov holding an audio (0×0) trak before it
    val audio = Mp4.build(1000, 24, 0, 0, Array.emptyByteArray)
    def trakOf(b: Array[Byte]): Array[Byte] = {
      // moov starts after ftyp(20): content at 20+8; mvhd is 108 bytes
      val trakStart = 20 + 8 + 108
      val len = java.nio.ByteBuffer.wrap(b, trakStart, 4).getInt
      java.util.Arrays.copyOfRange(b, trakStart, trakStart + len)
    }
    val mvhdBox = java.util.Arrays.copyOfRange(video, 20 + 8, 20 + 8 + 108)
    val moovContent = mvhdBox ++ trakOf(audio) ++ trakOf(video)
    val moov = java.nio.ByteBuffer.allocate(8 + moovContent.length)
      .putInt(8 + moovContent.length).put("moov".getBytes).put(moovContent).array()
    val container = video.take(20) ++ moov
    val info = Mp4.parse(container).getOrElse(fail("two-track container must parse"))
    assert(info.width == 640 && info.height == 360,
      s"geometry must come from the non-zero (video) trak, got ${info.width}×${info.height}")
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
