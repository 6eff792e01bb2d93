package graft

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import javax.imageio.{IIOImage, ImageIO, ImageWriteParam}

import graft.operators.MultimodalOps

/** GIF decode (SURVEY §2-C, round 10): LZW, palettes, interlace —
  * fixtures from the JDK's own GIF encoder; GIF is lossless for a
  * paletted source, so assertions are exact. */
class GifSpec extends SparkSpec {

  private val W = 37 // odd sizes: no block alignment luck
  private val H = 23

  private def grayImage: BufferedImage = {
    val img = new BufferedImage(W, H, BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until H; x <- 0 until W) {
      val v = (x * 6 + y * 5) % 250
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    img
  }

  private def encode(img: BufferedImage, interlace: Boolean = false): Array[Byte] = {
    val w = ImageIO.getImageWritersByFormatName("gif").next()
    val p = w.getDefaultWriteParam
    if (interlace) p.setProgressiveMode(ImageWriteParam.MODE_DEFAULT)
    else p.setProgressiveMode(ImageWriteParam.MODE_DISABLED)
    val bos = new ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(bos)
    w.setOutput(ios)
    w.write(null, new IIOImage(img, null, null), p)
    w.dispose()
    ios.close() // the stream buffers — without the close, zero bytes land
    bos.toByteArray
  }

  test("JDK-encoded GIF decodes exactly (lossless palette round trip)") {
    val img = grayImage
    val bytes = encode(img)
    assert(new String(bytes, 0, 6, "US-ASCII").startsWith("GIF8"))
    val f = MultimodalOps.decodeGif(bytes, 16).get
    assert(f(0) == W.toFloat && f(1) == H.toFloat, f.toSeq)
    // exact truth from the JDK's own decode of the same bytes
    val jdk = ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    val raster = jdk.getRaster
    val vals = for (y <- 0 until H; x <- 0 until W) yield raster.getSample(x, y, 0)
    assert(f(2) == (vals.sum.toDouble / (W * H) / 255).toFloat, f.toSeq)
    assert(f(5) == vals.min / 255f && f(8) == vals.max / 255f, f.toSeq)
  }

  test("interlaced GIF decodes to the same pixels as non-interlaced") {
    val img = grayImage
    val plain = encode(img)
    val inter = encode(img, interlace = true)
    assert(!java.util.Arrays.equals(plain, inter), "fixtures must differ on disk")
    // interlace flag really set in the image descriptor (walk the block
    // chain — a bare 0x2c scan can hit palette bytes)
    def descriptorFlags(b: Array[Byte]): Int = {
      var i = 13
      if ((b(10) & 0x80) != 0) i += 3 * (2 << (b(10) & 7))
      while ((b(i) & 0xff) == 0x21) {
        i += 2
        while ((b(i) & 0xff) != 0) i += 1 + (b(i) & 0xff)
        i += 1
      }
      assert((b(i) & 0xff) == 0x2c, "image descriptor")
      b(i + 9) & 0xff
    }
    assert((descriptorFlags(inter) & 0x40) != 0, "interlace bit set")
    assert((descriptorFlags(plain) & 0x40) == 0, "plain fixture not interlaced")
    assert(MultimodalOps.decodeGif(plain, 16).get.toSeq ==
      MultimodalOps.decodeGif(inter, 16).get.toSeq)
  }

  test("GIF dHash equals the lossless source; sniffed through decodeBatches") {
    import spark.implicits._
    val img = grayImage
    val gif = encode(img)
    val ppm = (s"P6\n$W $H\n255\n".getBytes("US-ASCII") ++
      (for (y <- 0 until H; x <- 0 until W) yield img.getRaster.getSample(x, y, 0))
        .flatMap(v => Seq(v.toByte, v.toByte, v.toByte))).toArray
    assert(MultimodalOps.dhashOf(gif).get == MultimodalOps.dhashOf(ppm).get,
      "lossless container change must not move a single dHash bit")
    val df = Seq((1L, "video/mp4", gif)).toDF("doc_id", "mime", "payload")
    val out = MultimodalOps.decodeBatches(df, dim = 16).collect().head
    assert(out.getSeq[Float](3)(0) == W.toFloat)
  }

  test("partial or offset first frame falls to the stub (round-11 crop guard)") {
    // the JDK encoder always writes full-frame descriptors, so build the
    // guard's inputs by hand: walk to the image descriptor and patch its
    // left/top/dims — decoding such a frame would silently hash a crop
    val base = encode(grayImage)
    def descriptorOffset(b: Array[Byte]): Int = {
      var i = 13
      if ((b(10) & 0x80) != 0) i += 3 * (2 << (b(10) & 7))
      while ((b(i) & 0xff) == 0x21) {
        i += 2
        while ((b(i) & 0xff) != 0) i += 1 + (b(i) & 0xff)
        i += 1
      }
      assert((b(i) & 0xff) == 0x2c, "image descriptor")
      i
    }
    val d = descriptorOffset(base)
    assert(MultimodalOps.decodeGif(base, 16).isDefined, "unpatched sanity")
    // frame offset left=1 → crop guard
    val offset = base.clone()
    offset(d + 1) = 1
    assert(MultimodalOps.decodeGif(offset, 16).isEmpty, "offset frame")
    // frame top=2 → crop guard
    val top = base.clone()
    top(d + 3) = 2
    assert(MultimodalOps.decodeGif(top, 16).isEmpty, "offset-top frame")
    // frame narrower than the logical screen → crop guard
    val narrow = base.clone()
    narrow(d + 5) = ((W - 1) & 0xff).toByte
    assert(MultimodalOps.decodeGif(narrow, 16).isEmpty, "narrow frame")
    // frame shorter than the logical screen → crop guard
    val short = base.clone()
    short(d + 7) = ((H - 1) & 0xff).toByte
    assert(MultimodalOps.decodeGif(short, 16).isEmpty, "short frame")
  }

  test("rejects truncated streams and junk") {
    val gif = encode(grayImage)
    assert(MultimodalOps.decodeGif(gif.dropRight(gif.length / 2), 16).isEmpty)
    assert(MultimodalOps.decodeGif("GIF89a but not really".getBytes("US-ASCII"), 16).isEmpty)
    assert(MultimodalOps.decodeGif("nope".getBytes("US-ASCII"), 16).isEmpty)
  }
}
