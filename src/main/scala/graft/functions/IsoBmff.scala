package graft.functions

/** REAL video-container metadata parser — an ISO Base Media File Format
  * (MP4/MOV family, ISO/IEC 14496-12) box walker in pure JVM code. The
  * JDK ships no video CODEC, so pixel decode stays behind the
  * [[graft.operators.MultimodalOps.MediaCodec]] seam — but the container
  * STRUCTURE is plain big-endian byte grammar, and the metadata a
  * curation pipeline actually filters on (duration, track count,
  * declared dimensions, brand) parses without any codec:
  *
  *   [size:u32][type:4cc][payload]  — size==1 ⇒ 64-bit largesize follows,
  *   size==0 ⇒ box extends to end of file. `ftyp` carries the brand;
  *   `moov/mvhd` carries timescale + duration (v0 32-bit, v1 64-bit
  *   fields); each `moov/trak/tkhd` carries track dimensions as 16.16
  *   fixed point.
  *
  * Hostile-input posture (payloads are untrusted bytes): all offsets are
  * Long (u32 sizes cannot wrap negative), a box whose size is smaller
  * than its own header aborts the walk (no zero-progress loop),
  * truncated boxes clamp to the buffer end, and recursion depth is
  * bounded by the fixed ftyp→moov→trak path — any parse failure returns
  * None and the caller falls back to byte-level features, never throws. */
object IsoBmff {

  /** Parsed container metadata. `duration_ms` is mvhd duration rescaled
    * to milliseconds (integer arithmetic: units * 1000 / timescale);
    * `width`/`height` are the first video track's integer part of the
    * 16.16 tkhd dimensions (0 when no trak declares any). */
  final case class VideoMeta(major_brand: String, timescale: Long,
      duration_ms: Long, n_tracks: Int, width: Int, height: Int)

  private def be32(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xFFL) << 24) | ((b(off + 1) & 0xFFL) << 16) |
      ((b(off + 2) & 0xFFL) << 8) | (b(off + 3) & 0xFFL)

  private def be64(b: Array[Byte], off: Int): Long =
    (be32(b, off) << 32) | be32(b, off + 4)

  private def fourcc(b: Array[Byte], off: Int): String =
    new String(b, off, 4, java.nio.charset.StandardCharsets.ISO_8859_1)

  /** Header probe: an ISO-BMFF file starts with a box whose type is
    * `ftyp` (the spec requires it first). */
  def accepts(content: Array[Byte]): Boolean =
    content != null && content.length >= 16 && fourcc(content, 4) == "ftyp"

  /** Walk the box tree; None when the bytes are not ISO-BMFF or the
    * required `mvhd` never materializes. */
  def probe(content: Array[Byte]): Option[VideoMeta] = {
    if (!accepts(content)) return None
    try {
      var major = ""
      var timescale = 0L
      var durationUnits = 0L
      var nTracks = 0
      var w = 0
      var h = 0

      // path ∈ {"", "moov", "trak"} — the only containers we descend into
      def walk(start: Long, end: Long, path: String): Unit = {
        var off = start
        var live = true
        while (live && off + 8 <= end) {
          var size = be32(content, off.toInt)
          var hdr = 8L
          val typ = fourcc(content, off.toInt + 4)
          if (size == 1L && off + 16 <= end) {
            size = be64(content, (off + 8).toInt)
            hdr = 16L
          } else if (size == 0L) size = end - off // extends to end of file
          if (size < hdr) live = false // hostile: box smaller than header
          else {
            val boxEnd = math.min(end, off + size)
            val p = off + hdr // payload start
            typ match {
              case "ftyp" if path == "" && p + 4 <= boxEnd =>
                major = fourcc(content, p.toInt)
              case "moov" if path == "" => walk(p, boxEnd, "moov")
              case "trak" if path == "moov" =>
                nTracks += 1; walk(p, boxEnd, "trak")
              case "mvhd" if path == "moov" && p + 4 <= boxEnd =>
                val ver = content(p.toInt) & 0xFF
                if (ver == 1 && p + 32 <= boxEnd) {
                  timescale = be32(content, (p + 20).toInt)
                  durationUnits = be64(content, (p + 24).toInt)
                } else if (ver == 0 && p + 24 <= boxEnd) {
                  timescale = be32(content, (p + 12).toInt)
                  durationUnits = be32(content, (p + 16).toInt)
                }
              case "tkhd" if path == "trak" && w == 0 && h == 0 &&
                  p + 4 <= boxEnd =>
                val ver = content(p.toInt) & 0xFF
                val wOff = if (ver == 1) 88L else 76L // 16.16 fixed point
                if (p + wOff + 8 <= boxEnd) {
                  w = (be32(content, (p + wOff).toInt) >> 16).toInt
                  h = (be32(content, (p + wOff + 4).toInt) >> 16).toInt
                }
              case _ => // unknown box: skip (forward compatibility)
            }
            off += size
          }
        }
      }

      walk(0L, content.length.toLong, "")
      if (timescale <= 0L) None
      else Some(VideoMeta(major, timescale,
        durationUnits * 1000L / timescale, nTracks, w, h))
    } catch { case _: Exception => None }
  }
}
