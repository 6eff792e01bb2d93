package graft.operators

/** Dependency-free GIF decoder (87a/89a, the web's other ubiquitous
  * legacy image container): logical screen descriptor + global/local
  * color tables, extension-block skip, FIRST image descriptor decoded
  * via the GIF flavor of LZW (variable 3-12-bit codes, clear/EOI,
  * dictionary rebuild), interlace row remap, palette → RGB feed of the
  * shared [[MultimodalOps.PixelSink]] — so stats and dHash ride the
  * same walk as every other format. Animated GIFs contribute their
  * first frame (the thumbnail/dedup-relevant one), and ONLY when that
  * frame covers the whole logical screen (left/top = 0, frame dims =
  * screen dims) — an offset or partial first frame would silently hash
  * a crop, so it returns None and falls to the stub like malformed
  * streams, missing color tables, or a lying geometry do.
  * Spec-tested against the JDK's own ImageIO GIF encoder. */
private[graft] object GifDecode {

  import MultimodalOps.PixelSink

  private final class GifError extends RuntimeException(null, null, false, false)
  private def fail(): Nothing = throw new GifError

  def walk(bytes: Array[Byte], sink: PixelSink): Option[(Int, Int)] = {
    if (bytes.length < 13) return None
    val magic = new String(bytes, 0, 6, "US-ASCII")
    if (magic != "GIF87a" && magic != "GIF89a") return None
    try decode(bytes, sink)
    catch {
      case _: GifError | _: ArrayIndexOutOfBoundsException |
           _: NegativeArraySizeException => None
    }
  }

  private def decode(bytes: Array[Byte], sink: PixelSink): Option[(Int, Int)] = {
    def u8(i: Int): Int = { if (i >= bytes.length) fail(); bytes(i) & 0xff }
    def u16le(i: Int): Int = u8(i) | (u8(i + 1) << 8)

    val flags = u8(10)
    var i = 13
    var gct: Array[Int] = null // packed 0xRRGGBB
    if ((flags & 0x80) != 0) {
      val n = 2 << (flags & 7)
      gct = Array.tabulate(n)(j =>
        (u8(i + j * 3) << 16) | (u8(i + j * 3 + 1) << 8) | u8(i + j * 3 + 2))
      i += n * 3
    }

    while (true) {
      u8(i) match {
        case 0x3b => return None // trailer before any image
        case 0x21 => // extension: label + sub-blocks
          i += 2
          while (u8(i) != 0) i += 1 + u8(i)
          i += 1
        case 0x2c => // image descriptor — decode this frame and finish
          val left = u16le(i + 1)
          val top = u16le(i + 3)
          val w = u16le(i + 5)
          val h = u16le(i + 7)
          val iflags = u8(i + 9)
          if (w <= 0 || h <= 0 || w.toLong * h > 64L * 1024 * 1024) return None
          // a first frame that is NOT the whole logical screen (offset, or
          // smaller than the canvas) would silently hash a crop — fall to
          // the stub instead of lying about the image's pixels
          if (left != 0 || top != 0 || w != u16le(6) || h != u16le(8)) return None
          i += 10
          var palette = gct
          if ((iflags & 0x80) != 0) {
            val n = 2 << (iflags & 7)
            palette = Array.tabulate(n)(j =>
              (u8(i + j * 3) << 16) | (u8(i + j * 3 + 1) << 8) | u8(i + j * 3 + 2))
            i += n * 3
          }
          if (palette == null) return None // no color table at all
          val interlaced = (iflags & 0x40) != 0
          val minCode = u8(i)
          i += 1
          if (minCode < 2 || minCode > 8) return None
          // concatenate the data sub-blocks
          val data = new java.io.ByteArrayOutputStream()
          while (u8(i) != 0) {
            val n = u8(i)
            if (i + 1 + n > bytes.length) fail()
            data.write(bytes, i + 1, n)
            i += 1 + n
          }
          val indices = lzw(data.toByteArray, minCode, w * h)
          feed(sink, indices, palette, w, h, interlaced)
          return Some((w, h))
        case _ => fail()
      }
    }
    None
  }

  /** GIF-LZW: variable-width codes starting at minCode+1 bits, CLEAR
    * resets the dictionary, EOI or `need` pixels ends. Little-endian
    * bit packing (LSB first — the opposite of JPEG). */
  private def lzw(data: Array[Byte], minCode: Int, need: Int): Array[Byte] = {
    val clear = 1 << minCode
    val eoi = clear + 1
    val out = new Array[Byte](need)
    var outPos = 0
    // dictionary as prefix links: suffix byte + prefix code per entry
    val maxEntries = 4096
    val prefix = new Array[Int](maxEntries)
    val suffix = new Array[Byte](maxEntries)
    val stack = new Array[Byte](maxEntries)
    var dictSize = eoi + 1
    var codeBits = minCode + 1
    var bitPos = 0
    def readCode(): Int = {
      var v = 0
      var got = 0
      while (got < codeBits) {
        val byteIdx = bitPos >> 3
        if (byteIdx >= data.length) return eoi // truncated → end
        val bit = (data(byteIdx) >> (bitPos & 7)) & 1
        v |= bit << got
        got += 1
        bitPos += 1
      }
      v
    }
    var prev = -1
    var firstByte: Byte = 0
    while (outPos < need) {
      val code = readCode()
      if (code == eoi) {
        if (outPos < need) fail() // short stream
      } else if (code == clear) {
        dictSize = eoi + 1
        codeBits = minCode + 1
        prev = -1
      } else {
        var sp = 0
        var c = code
        if (code >= dictSize) { // KwKwK: string(prev) + firstChar(prev)
          if (code != dictSize || prev < 0) fail()
          stack(sp) = firstByte // stack BOTTOM → emitted LAST
          sp += 1
          c = prev
        }
        while (c >= clear + 2) { // walk the chain down to a root
          stack(sp) = suffix(c); sp += 1
          c = prefix(c)
        }
        if (c >= clear) fail() // control code inside a chain = corrupt
        firstByte = c.toByte // root code = literal palette index
        // emit root, then pop (near-root suffixes first)
        if (outPos < need) { out(outPos) = firstByte; outPos += 1 }
        while (sp > 0 && outPos < need) {
          sp -= 1
          out(outPos) = stack(sp)
          outPos += 1
        }
        if (prev >= 0 && dictSize < maxEntries) {
          prefix(dictSize) = prev
          suffix(dictSize) = firstByte
          dictSize += 1
          if (dictSize == (1 << codeBits) && codeBits < 12) codeBits += 1
        }
        prev = code
      }
    }
    out
  }

  private val InterlacePasses = Array((0, 8), (4, 8), (2, 4), (1, 2))

  private def feed(sink: PixelSink, indices: Array[Byte], palette: Array[Int],
                   w: Int, h: Int, interlaced: Boolean): Unit = {
    // map storage rows → display rows (identity when non-interlaced)
    val rowOf = new Array[Int](h)
    if (interlaced) {
      var srcRow = 0
      InterlacePasses.foreach { case (start, step) =>
        var y = start
        while (y < h) { rowOf(y) = srcRow; srcRow += 1; y += step }
      }
    } else {
      var y = 0
      while (y < h) { rowOf(y) = y; y += 1 }
    }
    sink.start(w, h)
    var y = 0
    while (y < h) {
      val base = rowOf(y) * w
      var x = 0
      while (x < w) {
        val idx = indices(base + x) & 0xff
        val rgb = if (idx < palette.length) palette(idx) else 0
        sink.px((rgb >> 16) & 0xff, (rgb >> 8) & 0xff, rgb & 0xff)
        x += 1
      }
      y += 1
    }
  }
}
