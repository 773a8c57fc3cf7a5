package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}

/** Minimal ISO base-media-file-format (MP4) container support — pure
  * box structure per the public ISO/IEC 14496-12 layout: a writer for
  * fixture synthesis and a parser for metadata decode. What is REAL
  * here: box walking, `mvhd` timescale/duration, `tkhd` display
  * geometry (16.16 fixed point), `mdat` payload extraction. What is
  * NOT attempted: frame/pixel decode — that needs video codecs the JDK
  * does not ship, and stays behind the documented fake-feature seam
  * ([[Multimodal.fakeVideoFeatures]]).
  *
  * Parser posture matches the sidecar loaders: ANY malformation
  * (truncated box, overflow size, missing moov) returns None and the
  * caller degrades to metadata-less rows — never an exception on the
  * executor hot path. */
object Mp4 {

  /** Parsed container metadata. `duration` is in `timescale` units.
    * mdat travels as OFFSETS into the container bytes, not a copy —
    * the decode hot path would otherwise hold every payload twice. */
  final case class Info(timescale: Int, duration: Long,
      width: Int, height: Int, mdatStart: Int, mdatEnd: Int) {
    def mdat(container: Array[Byte]): Array[Byte] =
      java.util.Arrays.copyOfRange(container, mdatStart, mdatEnd)
  }

  // ---- writer ---------------------------------------------------------

  private def box(tpe: String, content: Array[Byte]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + content.length).order(ByteOrder.BIG_ENDIAN)
    bb.putInt(8 + content.length)
    bb.put(tpe.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    bb.put(content)
    bb.array()
  }

  private val unityMatrix: Array[Int] =
    Array(0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)

  /** A valid-by-construction single-track container: ftyp + moov(mvhd,
    * trak(tkhd)) + mdat(payload). Version-0 boxes throughout. */
  def build(timescale: Int, duration: Int, width: Int, height: Int,
      payload: Array[Byte]): Array[Byte] = {
    val ftyp = box("ftyp", {
      val bb = ByteBuffer.allocate(12).order(ByteOrder.BIG_ENDIAN)
      bb.put("isom".getBytes); bb.putInt(0); bb.put("isom".getBytes)
      bb.array()
    })
    val mvhd = box("mvhd", {
      val bb = ByteBuffer.allocate(100).order(ByteOrder.BIG_ENDIAN)
      bb.putInt(0) // version 0 + flags
      bb.putInt(0); bb.putInt(0) // creation, modification
      bb.putInt(timescale); bb.putInt(duration)
      bb.putInt(0x00010000) // rate 1.0
      bb.putShort(0x0100.toShort) // volume 1.0
      bb.putShort(0); bb.putInt(0); bb.putInt(0) // reserved
      unityMatrix.foreach(bb.putInt)
      (0 until 6).foreach(_ => bb.putInt(0)) // pre_defined
      bb.putInt(2) // next_track_id
      bb.array()
    })
    val tkhd = box("tkhd", {
      val bb = ByteBuffer.allocate(84).order(ByteOrder.BIG_ENDIAN)
      bb.putInt(0x000007) // version 0 + flags: enabled|in-movie|in-preview
      bb.putInt(0); bb.putInt(0) // creation, modification
      bb.putInt(1) // track id
      bb.putInt(0) // reserved
      bb.putInt(duration)
      bb.putLong(0) // reserved
      bb.putShort(0); bb.putShort(0); bb.putShort(0); bb.putShort(0) // layer/group/volume/reserved
      unityMatrix.foreach(bb.putInt)
      bb.putInt(width << 16); bb.putInt(height << 16) // 16.16 fixed point
      bb.array()
    })
    val moov = box("moov", mvhd ++ box("trak", tkhd))
    val mdat = box("mdat", payload)
    ftyp ++ moov ++ mdat
  }

  // ---- parser ---------------------------------------------------------

  /** Top-level (or child) box walk: (type, contentStart, contentEnd).
    * Handles all three spec size encodings — plain 32-bit, `size==1`
    * with a 64-bit largesize (standard for >4 GB mdat), and `size==0`
    * meaning box-extends-to-end — and stops at the first malformed
    * header (a parse over the prefix is still usable). */
  private def boxes(b: Array[Byte], from: Int, to: Int): Seq[(String, Int, Int)] = {
    val out = Seq.newBuilder[(String, Int, Int)]
    var p = from
    while (p + 8 <= to) {
      val size32 = ByteBuffer.wrap(b, p, 4).order(ByteOrder.BIG_ENDIAN).getInt
      val tpe = new String(b, p + 4, 4, java.nio.charset.StandardCharsets.US_ASCII)
      val (hdr, size): (Int, Long) = size32 match {
        case 0 => (8, (to - p).toLong) // last box: extends to end
        case 1 =>
          if (p + 16 > to) return out.result()
          (16, ByteBuffer.wrap(b, p + 8, 8).order(ByteOrder.BIG_ENDIAN).getLong)
        case s => (8, (s.toLong & 0xFFFFFFFFL))
      }
      if (size < hdr || p + size > to) return out.result() // malformed tail: stop
      out += ((tpe, p + hdr, (p + size).toInt))
      p = (p + size).toInt
    }
    out.result()
  }

  private def find(b: Array[Byte], from: Int, to: Int, tpe: String): Option[(Int, Int)] =
    boxes(b, from, to).collectFirst { case (`tpe`, s, e) => (s, e) }

  /** tkhd geometry for one trak, if present and non-degenerate. */
  private def trakGeometry(bytes: Array[Byte], ts: Int, te: Int): Option[(Int, Int)] =
    find(bytes, ts, te, "tkhd").flatMap { case (ks, ke) =>
      val bb = ByteBuffer.wrap(bytes, ks, ke - ks).order(ByteOrder.BIG_ENDIAN)
      val version = bb.get() & 0xFF
      val geomOff = version match {
        // verflags4 + ctime4 mtime4 id4 res4 dur4 res8 l2 a2 v2 r2 matrix36
        case 0 => 76
        // verflags4 + ctime8 mtime8 id4 res4 dur8 res8 l2 a2 v2 r2 matrix36
        case 1 => 88
        case _ => -1
      }
      if (geomOff < 0 || ks + geomOff + 8 > ke) None
      else {
        val gb = ByteBuffer.wrap(bytes, ks + geomOff, 8).order(ByteOrder.BIG_ENDIAN)
        Some((gb.getInt >>> 16, gb.getInt >>> 16)) // 16.16 → integer part
      }
    }

  def parse(bytes: Array[Byte]): Option[Info] =
    try {
      val top = boxes(bytes, 0, bytes.length)
      for {
        (ms, me) <- top.collectFirst { case ("moov", s, e) => (s, e) }
        (hs, he) <- find(bytes, ms, me, "mvhd")
        (ts, dur) <- {
          val bb = ByteBuffer.wrap(bytes, hs, he - hs).order(ByteOrder.BIG_ENDIAN)
          val version = bb.get() & 0xFF
          bb.position(bb.position() + 3) // flags
          // timescale/duration are spec-UNSIGNED 32-bit in version 0 —
          // a plain getInt sign-extends long recordings negative
          version match {
            case 0 => bb.position(bb.position() + 8) // 32-bit times
              Some((bb.getInt, bb.getInt.toLong & 0xFFFFFFFFL))
            case 1 => bb.position(bb.position() + 16) // 64-bit times
              Some((bb.getInt, bb.getLong))
            case _ => None
          }
        }
        if ts > 0 // unsigned-overflowed or zero timescale: malformed
        // real muxed files often order [audio, video]; an audio tkhd
        // carries 0×0 geometry, so take the first trak with a NON-ZERO
        // box rather than blindly the first trak
        (w, h) <- {
          val geoms = boxes(bytes, ms, me).collect { case ("trak", s, e) => (s, e) }
            .flatMap { case (s, e) => trakGeometry(bytes, s, e) }
          geoms.find { case (gw, gh) => gw > 0 && gh > 0 }.orElse(geoms.headOption)
        }
      } yield {
        val (mdS, mdE) = top.collectFirst { case ("mdat", s, e) => (s, e) }.getOrElse((0, 0))
        Info(ts, dur, w, h, mdS, mdE)
      }
    } catch { case scala.util.control.NonFatal(_) => None }
}
