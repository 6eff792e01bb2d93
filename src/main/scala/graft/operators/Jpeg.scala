package graft.operators

/** Dependency-free JPEG decoder (ITU-T T.81), BASELINE sequential DCT
  * (SOF0/SOF1) and PROGRESSIVE DCT (SOF2) — the two formats ~all real
  * crawl images arrive in. Scope: 8-bit precision, 1 (grayscale) or 3
  * (YCbCr) components, sampling factors up to 2×2 (4:4:4 / 4:2:2 /
  * 4:2:0 — the JDK encoder's default RGB output is 4:2:0, so subsampled
  * chroma is the EXERCISED path, not an afterthought), 0xFF00 byte
  * unstuffing, DRI/RSTn restart intervals. Progressive covers the full
  * T.81 annex G Huffman path: interleaved/non-interleaved DC scans,
  * per-component spectral-selection AC scans with EOB runs, and
  * successive-approximation refinement for both (DC bit appends; the
  * G.1.2.3 AC correction-bit walk) — coefficients accumulate per
  * component across scans, dequant + IDCT run ONCE at EOI. Arithmetic
  * coding, 12-bit, hierarchical, and CMYK are out of scope → None,
  * caller falls back to the stub.
  *
  * Pipeline: marker walk (DQT/DHT/SOF/DRI/SOS) → per-MCU canonical-
  * Huffman entropy decode (DC predictors per component, AC run/size,
  * EOB/ZRL) → dequant in zigzag order → separable double IDCT + level
  * shift → component planes at their native subsampled resolution →
  * row-major feed of the shared [[MultimodalOps.PixelSink]] with
  * nearest-neighbor chroma upsampling and JFIF YCbCr→RGB. Stats and
  * dHash therefore ride the SAME walk as PPM/BMP/PNG/QOI.
  *
  * Decode is lossy-by-format, so cross-format assertions are
  * tolerance-based (spec: JDK-encoded JPEG of a known image decodes to
  * stats within tolerance and a dHash within a small Hamming distance
  * of the lossless source). A geometry guard bounds memory against
  * lying headers, like the PNG/QOI paths. */
private[graft] object JpegDecode {

  import MultimodalOps.PixelSink

  private final class JpegError extends RuntimeException(null, null, false, false)
  private def fail(): Nothing = throw new JpegError

  private val ZigZag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63)

  /** cos((2x+1)·u·π/16) · Cu · ½ — the separable IDCT basis. */
  private val Cos: Array[Array[Double]] = Array.tabulate(8, 8) { (u, x) =>
    val cu = if (u == 0) 1.0 / math.sqrt(2) else 1.0
    0.5 * cu * math.cos((2 * x + 1) * u * math.Pi / 16)
  }

  /** Canonical Huffman table (T.81 annex C construction). */
  private final class Huff(counts: Array[Int], symbols: Array[Int]) {
    private val maxcode = Array.fill(17)(-1)
    private val mincode = new Array[Int](17)
    private val valptr = new Array[Int](17)
    locally {
      var code = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        if (counts(l - 1) > 0) {
          valptr(l) = k
          mincode(l) = code
          code += counts(l - 1)
          k += counts(l - 1)
          maxcode(l) = code - 1
        }
        code <<= 1
        l += 1
      }
    }
    def decode(br: BitReader): Int = {
      var code = 0
      var l = 1
      while (l <= 16) {
        code = (code << 1) | br.bit()
        if (maxcode(l) >= 0 && code <= maxcode(l))
          return symbols(valptr(l) + code - mincode(l))
        l += 1
      }
      fail()
    }
  }

  /** Bit reader over an already-unstuffed entropy segment. */
  private final class BitReader(data: Array[Byte]) {
    private var pos = 0
    private var cur = 0
    private var nbits = 0
    def bit(): Int = {
      if (nbits == 0) {
        if (pos >= data.length) fail()
        cur = data(pos) & 0xff
        pos += 1
        nbits = 8
      }
      nbits -= 1
      (cur >> nbits) & 1
    }
    def bits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }
  }

  /** DC/AC magnitude extension (T.81 F.2.2.1). */
  private def extend(v: Int, t: Int): Int =
    if (t == 0) 0 else if (v < (1 << (t - 1))) v - (1 << t) + 1 else v

  /** In-place separable 2-D IDCT of one dequantized 8×8 block. */
  private def idct(block: Array[Double]): Unit = {
    val tmp = new Array[Double](64)
    var y = 0
    while (y < 8) { // rows: 1-D over u
      var x = 0
      while (x < 8) {
        var s = 0.0
        var u = 0
        while (u < 8) { s += Cos(u)(x) * block(y * 8 + u); u += 1 }
        tmp(y * 8 + x) = s
        x += 1
      }
      y += 1
    }
    var x = 0
    while (x < 8) { // cols: 1-D over v
      var y2 = 0
      while (y2 < 8) {
        var s = 0.0
        var v = 0
        while (v < 8) { s += Cos(v)(y2) * tmp(v * 8 + x); v += 1 }
        block(y2 * 8 + x) = s
        y2 += 1
      }
      x += 1
    }
  }

  private def clamp(v: Double): Int = {
    val r = math.round(v).toInt
    if (r < 0) 0 else if (r > 255) 255 else r
  }

  private final case class Component(id: Int, h: Int, v: Int, tq: Int) {
    var dcTable = 0
    var acTable = 0
  }

  def walk(bytes: Array[Byte], sink: PixelSink): Option[(Int, Int)] = {
    if (bytes.length < 4 || (bytes(0) & 0xff) != 0xff ||
      (bytes(1) & 0xff) != 0xd8) return None
    try {
      decode(bytes, sink)
    } catch {
      case _: JpegError | _: ArrayIndexOutOfBoundsException |
           _: NegativeArraySizeException => None
    }
  }

  private def decode(bytes: Array[Byte], sink: PixelSink): Option[(Int, Int)] = {
    def u8(i: Int): Int = { if (i >= bytes.length) fail(); bytes(i) & 0xff }
    def u16(i: Int): Int = (u8(i) << 8) | u8(i + 1)

    val qt = Array.ofDim[Int](4, 64) // zigzag order, as stored
    val dcT = new Array[Huff](4)
    val acT = new Array[Huff](4)
    var comps: Array[Component] = null
    var w = 0
    var h = 0
    var restartInterval = 0
    var progressive = false
    // progressive state: per-component DCT coefficients (zigzag order,
    // MCU-padded block grid) accumulated across scans
    var coeffs: Array[Array[Int]] = null
    var anyScan = false

    var i = 2
    var sofSeen = false
    while (true) {
      // tolerate fill bytes before a marker
      while (u8(i) != 0xff) i += 1
      while (u8(i) == 0xff) i += 1
      val marker = u8(i)
      i += 1
      marker match {
        case 0xd9 => // EOI: progressive finishes HERE (all scans folded)
          if (progressive && anyScan)
            return finishProgressive(comps, w, h, qt, coeffs, sink)
          return None // baseline EOI before any scan decoded
        case 0xc0 | 0xc1 | 0xc2 => // baseline / ext. sequential / progressive
          val len = u16(i)
          if (u8(i + 2) != 8) return None // 12-bit out of scope
          h = u16(i + 3); w = u16(i + 5)
          val n = u8(i + 7)
          if (w <= 0 || h <= 0 || (n != 1 && n != 3)) return None
          if (w.toLong * h > 64L * 1024 * 1024) return None // bomb guard
          // progressive holds int coefficients (4× plane bytes) — tighter cap
          if (marker == 0xc2 && w.toLong * h > 16L * 1024 * 1024) return None
          comps = Array.tabulate(n) { c =>
            val o = i + 8 + c * 3
            val hv = u8(o + 1)
            val comp = Component(u8(o), hv >> 4, hv & 15, u8(o + 2))
            if (comp.h < 1 || comp.h > 2 || comp.v < 1 || comp.v > 2) fail()
            comp
          }
          progressive = marker == 0xc2
          sofSeen = true
          i += len
        case 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xc9 | 0xca | 0xcb |
             0xcd | 0xce | 0xcf =>
          return None // lossless/arithmetic/hierarchical out of scope
        case 0xc4 => // DHT (possibly several tables in one segment)
          val len = u16(i)
          var o = i + 2
          while (o < i + len) {
            val tc = u8(o) >> 4
            val th = u8(o) & 15
            if (tc > 1 || th > 3) fail()
            val counts = Array.tabulate(16)(j => u8(o + 1 + j))
            val total = counts.sum
            if (total > 256) fail()
            val symbols = Array.tabulate(total)(j => u8(o + 17 + j))
            val t = new Huff(counts, symbols)
            if (tc == 0) dcT(th) = t else acT(th) = t
            o += 17 + total
          }
          i += len
        case 0xdb => // DQT (possibly several tables)
          val len = u16(i)
          var o = i + 2
          while (o < i + len) {
            val pq = u8(o) >> 4
            val tq = u8(o) & 15
            if (pq > 1 || tq > 3) fail()
            var j = 0
            while (j < 64) {
              qt(tq)(j) = if (pq == 0) u8(o + 1 + j)
                          else u16(o + 1 + j * 2)
              j += 1
            }
            o += 1 + (if (pq == 0) 64 else 128)
          }
          i += len
        case 0xdd => // DRI
          restartInterval = u16(i + 2)
          i += u16(i)
        case 0xda => // SOS
          if (!sofSeen) fail()
          val len = u16(i)
          val ns = u8(i + 2)
          var o = i + 3
          val scan = new Array[Component](ns)
          var s = 0
          while (s < ns) {
            val cid = u8(o)
            val comp = comps.find(_.id == cid).getOrElse(fail())
            comp.dcTable = u8(o + 1) >> 4
            comp.acTable = u8(o + 1) & 15
            scan(s) = comp
            o += 2
            s += 1
          }
          val ss = u8(o)
          val se = u8(o + 1)
          val ah = u8(o + 2) >> 4
          val al = u8(o + 2) & 15
          i += len
          if (!progressive) {
            // baseline: ONE full scan, decode and finish
            if (ns != comps.length) return None
            return decodeScan(bytes, i, comps, w, h, qt, dcT, acT,
              restartInterval, sink)
          }
          // progressive: fold this scan into the coefficient store and
          // keep walking (tables may change between scans)
          if (coeffs == null) {
            val hMax = comps.map(_.h).max
            val vMax = comps.map(_.v).max
            val mcusX = (w + 8 * hMax - 1) / (8 * hMax)
            val mcusY = (h + 8 * vMax - 1) / (8 * vMax)
            coeffs = comps.map(c =>
              new Array[Int](mcusX * c.h * mcusY * c.v * 64))
          }
          i = decodeProgressiveScan(bytes, i, scan, comps, w, h, coeffs,
            dcT, acT, restartInterval, ss, se, ah, al)
          anyScan = true
        case m if m >= 0xd0 && m <= 0xd7 => // stray RST outside a scan
          ()
        case 0x01 => () // TEM, parameterless
        case _ => // APPn, COM, anything else: length-prefixed skip
          i += u16(i)
      }
    }
    None
  }

  /** Split the entropy stream at RST markers, unstuffing 0xFF00.
    * Also returns the index of the 0xFF opening the terminating marker
    * (so a multi-scan progressive walk can continue from there). */
  private def entropySegmentsWithEnd(bytes: Array[Byte],
                                     from: Int): (Array[Array[Byte]], Int) = {
    val segs = Vector.newBuilder[Array[Byte]]
    val cur = new java.io.ByteArrayOutputStream()
    var i = from
    var done = false
    while (!done && i < bytes.length) {
      val b = bytes(i) & 0xff
      if (b != 0xff) { cur.write(b); i += 1 }
      else {
        val b2 = if (i + 1 < bytes.length) bytes(i + 1) & 0xff else 0xd9
        if (b2 == 0x00) { cur.write(0xff); i += 2 } // stuffed data byte
        else if (b2 >= 0xd0 && b2 <= 0xd7) { // restart: segment boundary
          segs += cur.toByteArray; cur.reset(); i += 2
        } else done = true // EOI or any other marker ends the scan
      }
    }
    segs += cur.toByteArray
    (segs.result().toArray, i)
  }

  private def entropySegments(bytes: Array[Byte], from: Int): Array[Array[Byte]] =
    entropySegmentsWithEnd(bytes, from)._1

  private def decodeScan(bytes: Array[Byte], from: Int,
                         comps: Array[Component], w: Int, h: Int,
                         qt: Array[Array[Int]],
                         dcT: Array[Huff], acT: Array[Huff],
                         restartInterval: Int,
                         sink: PixelSink): Option[(Int, Int)] = {
    val hMax = comps.map(_.h).max
    val vMax = comps.map(_.v).max
    val mcusX = (w + 8 * hMax - 1) / (8 * hMax)
    val mcusY = (h + 8 * vMax - 1) / (8 * vMax)
    // per-component plane at its native (padded-to-MCU) resolution
    val planeW = comps.map(c => mcusX * 8 * c.h)
    val planes = comps.zipWithIndex.map { case (c, ci) =>
      new Array[Byte](planeW(ci) * mcusY * 8 * c.v)
    }
    val segments = entropySegments(bytes, from)
    var seg = 0
    var br = new BitReader(segments(0))
    val pred = new Array[Int](comps.length)
    val block = new Array[Double](64)

    var mcu = 0
    val nMcus = mcusX * mcusY
    while (mcu < nMcus) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        seg += 1 // next restart segment: byte-aligned, predictors reset
        if (seg >= segments.length) fail()
        br = new BitReader(segments(seg))
        java.util.Arrays.fill(pred, 0)
      }
      val mx = mcu % mcusX
      val my = mcu / mcusX
      var ci = 0
      while (ci < comps.length) {
        val c = comps(ci)
        val q = qt(c.tq)
        val dc = dcT(c.dcTable)
        val ac = acT(c.acTable)
        if (dc == null || ac == null) fail()
        var by = 0
        while (by < c.v) {
          var bx = 0
          while (bx < c.h) {
            java.util.Arrays.fill(block, 0.0)
            val t = dc.decode(br)
            if (t > 15) fail()
            pred(ci) += extend(br.bits(t), t)
            block(0) = pred(ci).toDouble * q(0)
            var k = 1
            var eob = false
            while (k < 64 && !eob) {
              val rs = ac.decode(br)
              val r = rs >> 4
              val sz = rs & 15
              if (sz == 0) {
                if (r == 15) k += 16 // ZRL
                else eob = true
              } else {
                k += r
                if (k > 63) fail()
                block(ZigZag(k)) = extend(br.bits(sz), sz).toDouble * q(k)
                k += 1
              }
            }
            idct(block)
            // place the block in the component plane (MCU-padded)
            val px0 = (mx * c.h + bx) * 8
            val py0 = (my * c.v + by) * 8
            val pw = planeW(ci)
            var yy = 0
            while (yy < 8) {
              var xx = 0
              val rowOff = (py0 + yy) * pw + px0
              while (xx < 8) {
                planes(ci)(rowOff + xx) =
                  clamp(block(yy * 8 + xx) + 128).toByte
                xx += 1
              }
              yy += 1
            }
            bx += 1
          }
          by += 1
        }
        ci += 1
      }
      mcu += 1
    }

    feedPlanes(planes, planeW, comps, w, h, hMax, vMax, sink)
  }

  /** Row-major sink feed off the component planes: nearest-neighbor
    * chroma upsample + JFIF YCbCr→RGB — shared by the baseline and
    * progressive endgames so stats/dHash ride ONE conversion. */
  private def feedPlanes(planes: Array[Array[Byte]], planeW: Array[Int],
                         comps: Array[Component], w: Int, h: Int,
                         hMax: Int, vMax: Int,
                         sink: PixelSink): Option[(Int, Int)] = {
    sink.start(w, h)
    val gray = comps.length == 1
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        if (gray) {
          val yy = planes(0)((y * comps(0).v / vMax) * planeW(0) +
            x * comps(0).h / hMax) & 0xff
          sink.px(yy, yy, yy)
        } else {
          def sample(ci: Int): Int =
            planes(ci)((y * comps(ci).v / vMax) * planeW(ci) +
              x * comps(ci).h / hMax) & 0xff
          val yy = sample(0).toDouble
          val cb = sample(1) - 128.0
          val cr = sample(2) - 128.0
          sink.px(
            clamp(yy + 1.402 * cr),
            clamp(yy - 0.344136 * cb - 0.714136 * cr),
            clamp(yy + 1.772 * cb))
        }
        x += 1
      }
      y += 1
    }
    Some((w, h))
  }

  /** One progressive scan (T.81 annex G, Huffman path) folded into the
    * per-component coefficient store. Handles all four scan kinds:
    * DC first / DC refine (interleaved or single-component), AC first /
    * AC refine (single-component spectral band with EOB runs and the
    * G.1.2.3 correction-bit walk). Returns the byte index of the marker
    * that ended the scan's entropy data. */
  private def decodeProgressiveScan(bytes: Array[Byte], from: Int,
                                    scan: Array[Component],
                                    comps: Array[Component], w: Int, h: Int,
                                    coeffs: Array[Array[Int]],
                                    dcT: Array[Huff], acT: Array[Huff],
                                    restartInterval: Int,
                                    ss: Int, se: Int, ah: Int, al: Int): Int = {
    val hMax = comps.map(_.h).max
    val vMax = comps.map(_.v).max
    val mcusX = (w + 8 * hMax - 1) / (8 * hMax)
    val mcusY = (h + 8 * vMax - 1) / (8 * vMax)
    // scan-header sanity (T.81 G.1): DC scans carry the 0..0 band; AC
    // scans carry one component and a band inside 1..63
    if (ss == 0 && se != 0) fail()
    if (ss > 0 && (scan.length != 1 || se < ss || se > 63)) fail()
    if (al > 13 || ah > 13 || (ah != 0 && ah != al + 1)) fail()

    val (segments, end) = entropySegmentsWithEnd(bytes, from)
    var seg = 0
    var br = new BitReader(segments(0))
    val pred = new Array[Int](comps.length)
    var eobrun = 0
    var unit = 0 // MCU counter (interleaved) or block counter (single)

    def restartIfDue(): Unit =
      if (restartInterval > 0 && unit > 0 && unit % restartInterval == 0) {
        seg += 1
        if (seg >= segments.length) fail()
        br = new BitReader(segments(seg))
        java.util.Arrays.fill(pred, 0)
        eobrun = 0
      }

    /** DC scan contribution for one block of component `ci` at
      * coefficient offset `base`. */
    def dcUnit(ci: Int, base: Int): Unit =
      if (ah == 0) { // first pass: diff-coded approximation at Al
        val t = dcT(comps(ci).dcTable) match {
          case null => fail()
          case tb => tb.decode(br)
        }
        if (t > 15) fail()
        pred(ci) += extend(br.bits(t), t)
        coeffs(ci)(base) = pred(ci) << al
      } else { // refinement: one appended bit per block
        if (br.bit() == 1) coeffs(ci)(base) |= 1 << al
      }

    /** AC band contribution for one block (single-component scans only). */
    def acUnit(ci: Int, base: Int): Unit = {
      val ac = acT(comps(ci).acTable)
      if (ac == null) fail()
      val cb = coeffs(ci)
      val p1 = 1 << al
      if (ah == 0) { // first pass for this band
        if (eobrun > 0) { eobrun -= 1 }
        else {
          var k = ss
          var done = false
          while (!done && k <= se) {
            val rs = ac.decode(br)
            val r = rs >> 4
            val s = rs & 15
            if (s == 0) {
              if (r < 15) { // EOBn: run of blocks ending here
                eobrun = (1 << r) - 1
                if (r > 0) eobrun += br.bits(r)
                done = true
              } else k += 16 // ZRL
            } else {
              k += r
              if (k > se) fail()
              cb(base + k) = extend(br.bits(s), s) << al
              k += 1
            }
          }
        }
      } else { // refinement (T.81 G.1.2.3): correction bits over history
        def refineNonzero(idx: Int): Unit =
          if (br.bit() == 1 && (cb(idx) & p1) == 0)
            cb(idx) += (if (cb(idx) >= 0) p1 else -p1)
        if (eobrun > 0) {
          eobrun -= 1
          var k = ss
          while (k <= se) {
            if (cb(base + k) != 0) refineNonzero(base + k)
            k += 1
          }
        } else {
          var k = ss
          while (k <= se) {
            val rs = ac.decode(br)
            var r = rs >> 4
            val s = rs & 15
            var sval = 0
            if (s == 0) {
              if (r < 15) { // EOBn: refine the rest of this block, then run
                eobrun = (1 << r) - 1
                if (r > 0) eobrun += br.bits(r)
                r = 64 // walk to the band end below
              } // r == 15: skip 16 zero-history coefficients
            } else {
              if (s != 1) fail()
              sval = if (br.bit() == 1) p1 else -p1
            }
            var placed = false
            while (!placed && k <= se) {
              val idx = base + k
              if (cb(idx) != 0) refineNonzero(idx)
              else if (r == 0) {
                if (sval != 0) cb(idx) = sval
                placed = true
              } else r -= 1
              k += 1
            }
          }
        }
      }
    }

    if (scan.length > 1) {
      // interleaved scan — DC only (AC scans are single-component by spec)
      if (ss != 0) fail()
      val scanIdx = scan.map(c => comps.indexWhere(_ eq c))
      var mcu = 0
      val nMcus = mcusX * mcusY
      while (mcu < nMcus) {
        restartIfDue()
        val mx = mcu % mcusX
        val my = mcu / mcusX
        var s = 0
        while (s < scan.length) {
          val ci = scanIdx(s)
          val c = comps(ci)
          val bpl = mcusX * c.h
          var by = 0
          while (by < c.v) {
            var bx = 0
            while (bx < c.h) {
              dcUnit(ci, ((my * c.v + by) * bpl + (mx * c.h + bx)) * 64)
              bx += 1
            }
            by += 1
          }
          s += 1
        }
        mcu += 1
        unit = mcu
      }
    } else {
      // single-component scan: blocks in the COMPONENT's own raster order
      // over its non-MCU-padded grid (T.81 non-interleaved geometry)
      val c = scan(0)
      val ci = comps.indexWhere(_ eq c)
      val compW = (w * c.h + hMax - 1) / hMax
      val compH = (h * c.v + vMax - 1) / vMax
      val wBlocks = (compW + 7) / 8
      val hBlocks = (compH + 7) / 8
      val bpl = mcusX * c.h // storage stride stays MCU-padded
      var b = 0
      val nBlocks = wBlocks * hBlocks
      while (b < nBlocks) {
        restartIfDue()
        val base = ((b / wBlocks) * bpl + (b % wBlocks)) * 64
        if (ss == 0) dcUnit(ci, base) else acUnit(ci, base)
        b += 1
        unit = b
      }
    }
    end
  }

  /** Progressive endgame at EOI: dequant the accumulated coefficients,
    * IDCT every block, fill the component planes, feed the sink — the
    * same ending as [[decodeScan]], run once over the final image. */
  private def finishProgressive(comps: Array[Component], w: Int, h: Int,
                                qt: Array[Array[Int]],
                                coeffs: Array[Array[Int]],
                                sink: PixelSink): Option[(Int, Int)] = {
    val hMax = comps.map(_.h).max
    val vMax = comps.map(_.v).max
    val mcusX = (w + 8 * hMax - 1) / (8 * hMax)
    val mcusY = (h + 8 * vMax - 1) / (8 * vMax)
    val planeW = comps.map(c => mcusX * 8 * c.h)
    val planes = comps.zipWithIndex.map { case (c, ci) =>
      new Array[Byte](planeW(ci) * mcusY * 8 * c.v)
    }
    val block = new Array[Double](64)
    var ci = 0
    while (ci < comps.length) {
      val c = comps(ci)
      val q = qt(c.tq)
      val cb = coeffs(ci)
      val bw = mcusX * c.h
      val bh = mcusY * c.v
      var bY = 0
      while (bY < bh) {
        var bX = 0
        while (bX < bw) {
          val base = (bY * bw + bX) * 64
          var k = 0
          while (k < 64) {
            block(ZigZag(k)) = cb(base + k).toDouble * q(k)
            k += 1
          }
          idct(block)
          val px0 = bX * 8
          val py0 = bY * 8
          val pw = planeW(ci)
          var yy = 0
          while (yy < 8) {
            var xx = 0
            val rowOff = (py0 + yy) * pw + px0
            while (xx < 8) {
              planes(ci)(rowOff + xx) = clamp(block(yy * 8 + xx) + 128).toByte
              xx += 1
            }
            yy += 1
          }
          bX += 1
        }
        bY += 1
      }
      ci += 1
    }
    feedPlanes(planes, planeW, comps, w, h, hMax, vMax, sink)
  }
}
