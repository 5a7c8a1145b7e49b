package graft

import graft.functions.IsoBmff
import graft.operators.MultimodalOps
import org.apache.spark.sql.functions._

class IsoBmffSpec extends SparkSpec {

  // -- fixture builders ----------------------------------------------------

  private def box(typ: String, payload: Array[Byte],
      largesize: Boolean = false): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(
      (if (largesize) 16 else 8) + payload.length)
    if (largesize) {
      bb.putInt(1); bb.put(typ.getBytes("ISO-8859-1"))
      bb.putLong(16L + payload.length)
    } else {
      bb.putInt(8 + payload.length); bb.put(typ.getBytes("ISO-8859-1"))
    }
    bb.put(payload)
    bb.array()
  }

  private def ftyp(brand: String): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(12)
    bb.put(brand.getBytes("ISO-8859-1")); bb.putInt(0)
    bb.put(brand.getBytes("ISO-8859-1"))
    box("ftyp", bb.array())
  }

  private def mvhdV1(timescale: Int, duration: Long): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(112)
    bb.putInt(0x01000000)              // version 1, flags 0
    bb.putLong(0L); bb.putLong(0L)     // ctime, mtime (64-bit in v1)
    bb.putInt(timescale); bb.putLong(duration)
    box("mvhd", bb.array())            // rest zero-padded (rate/matrix/…)
  }

  private def tkhdV1(w: Int, h: Int): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(100)
    bb.putInt(0x01000007)
    bb.putLong(0L); bb.putLong(0L)     // ctime, mtime
    bb.putInt(1); bb.putInt(0)         // track id, reserved
    bb.putLong(0L)                     // duration
    bb.position(88); bb.putInt(w << 16); bb.putInt(h << 16)
    box("tkhd", bb.array())
  }

  // -- parser --------------------------------------------------------------

  test("parses a v1 container with largesize moov and unknown boxes") {
    val trak = box("trak", tkhdV1(640, 480))
    val moov = box("moov", mvhdV1(90000, 450000L) ++ trak ++ trak,
      largesize = true)
    val skipMe = box("free", Array.fill[Byte](33)(0x7F))
    val mdat = box("mdat", "opaque sample data the walker must skip"
      .getBytes("UTF-8"))
    val file = ftyp("mp42") ++ skipMe ++ moov ++ mdat
    val v = IsoBmff.probe(file).get
    assert(v.major_brand == "mp42")
    assert(v.timescale == 90000L && v.duration_ms == 5000L)
    assert(v.n_tracks == 2)
    assert(v.width == 640 && v.height == 480, s"$v")
  }

  test("size==0 final box (extends to EOF) parses") {
    val moovPayload = mvhdV1(1000, 1234L)
    val bb = java.nio.ByteBuffer.allocate(8)
    bb.putInt(0); bb.put("moov".getBytes("ISO-8859-1"))
    val file = ftyp("isom") ++ bb.array() ++ moovPayload
    val v = IsoBmff.probe(file).get
    assert(v.duration_ms == 1234L && v.n_tracks == 0)
  }

  test("hostile inputs return None, never throw, never loop") {
    // not a container at all
    assert(IsoBmff.probe("plain text".getBytes("UTF-8")).isEmpty)
    assert(IsoBmff.probe(null).isEmpty)
    assert(IsoBmff.probe(Array.emptyByteArray).isEmpty)
    // ftyp present but no moov/mvhd
    assert(IsoBmff.probe(ftyp("isom")).isEmpty)
    // box size smaller than its own header: walk must stop, not spin
    val tiny = java.nio.ByteBuffer.allocate(8)
    tiny.putInt(3); tiny.put("moov".getBytes("ISO-8859-1"))
    assert(IsoBmff.probe(ftyp("isom") ++ tiny.array()).isEmpty)
    // truncation that cuts into the mvhd fields themselves: None
    val full = ftyp("isom") ++ box("moov", mvhdV1(1000, 99L))
    assert(IsoBmff.probe(full.take(44)).isEmpty)
    // truncation BEYOND the fields parses leniently with intact values
    assert(IsoBmff.probe(full.dropRight(40)).contains(
      IsoBmff.VideoMeta("isom", 1000L, 99L, 0, 0, 0)))
    // a PNG is not accepted
    val img = new java.awt.image.BufferedImage(4, 4,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    assert(!IsoBmff.accepts(bos.toByteArray))
  }

  // -- synthesized corpus --------------------------------------------------

  test("synthesized MP4 corpus parses with the documented arithmetic") {
    val rows = MultimodalOps.mp4FromDocuments(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.take(20).foreach { m =>
      val v = IsoBmff.probe(m.content).get
      // mdat carries the text: container = 236 fixed bytes + 8 + len
      val len = m.content.length - 236 - 8
      assert(v.major_brand == "isom" && v.timescale == 1000L
        && v.n_tracks == 1, s"$v")
      assert(v.duration_ms == len.toLong, s"$v vs len $len")
      assert(v.width == 1 + len % 64 && v.height == 1 + (len / 64) % 64)
    }
    // and the declared query's invariant fields hold corpus-wide
    val q = MultimodalOps.videoMeta(spark, sfDir)
    assert(q.where(col("n_tracks") =!= 1 || col("timescale") =!= 1000L
      || col("major_brand") =!= "isom").count() == 0)
  }
}
