package graft.functions

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.stream.MemoryCacheImageOutputStream
import javax.imageio.{IIOImage, ImageIO, ImageWriteParam}

/** Image kernels over the JDK's real PNG/JPEG codecs (javax.imageio — no
  * external libs, works headless). Images travel as opaque `binary` columns
  * (BASELINE.json input_hint); these kernels decode / re-encode / hash them
  * executor-side.
  *
  * Reference behavior grafted: srai handles images as PIL blobs per slippy
  * tile (srai/loaders/osm_loaders/osm_tile_loader.py:97-138) and as raster
  * tensors (geovex/dataset.py:137-167); the per-row invariant here is the
  * decoded-pixel PSNR ≥ 40 dB for lossy formats + caption byte-equality. */
object ImageOps {

  /** Deterministic smooth RGB pattern for a pattern key — smooth gradients
    * survive JPEG at high quality (PSNR >> 40 dB). Pure function of
    * (pattern, w, h): equal patterns ⇒ byte-identical images. */
  def synthPixels(pattern: Long, w: Int, h: Int): Array[Int] = {
    val px = new Array[Int](w * h)
    val p0 = ((pattern * 2654435761L) >>> 8) % 251
    val p1 = ((pattern * 40503L) >>> 4) % 241
    val p2 = (pattern * 97L) % 11 + 2
    // r depends only on x and g only on y — hoist each out of the inner
    // loop (round-7: cuts the sin() count from 3wh to wh+w+h, bit-exact
    // because the hoisted expressions are the per-pixel ones verbatim; the
    // md5 anchors in ImageSynthProjectionSpec pin the output bytes)
    val rRow = new Array[Int](w)
    var x = 0
    while (x < w) {
      val fx = x.toDouble / w
      rRow(x) =
        (127.5 + 127.5 * math.sin(2 * math.Pi * (fx * p2 / 4.0 + p0 / 251.0))).toInt << 16
      x += 1
    }
    val gCol = new Array[Int](h)
    var y = 0
    while (y < h) {
      val fy = y.toDouble / h
      gCol(y) =
        (127.5 + 127.5 * math.sin(2 * math.Pi * (fy * p2 / 4.0 + p1 / 241.0))).toInt << 8
      y += 1
    }
    y = 0
    while (y < h) {
      val fy = y.toDouble / h
      val rg = gCol(y)
      x = 0
      while (x < w) {
        val fx = x.toDouble / w
        val b = (127.5 + 127.5 * math.sin(2 * math.Pi * ((fx + fy) / 2.0 + (p0 + p1) / 128.0))).toInt
        px(y * w + x) = rRow(x) | rg | b
        x += 1
      }
      y += 1
    }
    px
  }

  /** Collapse to r=g=b luma. Lossy rows are stored grayscale: the JDK JPEG
    * writer always 4:2:0-subsamples chroma, which caps saturated-color PSNR
    * near 34 dB no matter the quality; constant chroma removes that error
    * source entirely, keeping the ≥40 dB invariant achievable. */
  def toGray(px: Array[Int]): Array[Int] = {
    val out = new Array[Int](px.length)
    var i = 0
    while (i < px.length) {
      val p = px(i)
      val y = (0.299 * ((p >> 16) & 255) + 0.587 * ((p >> 8) & 255) +
        0.114 * (p & 255)).round.toInt
      out(i) = (y << 16) | (y << 8) | y
      i += 1
    }
    out
  }

  def toBufferedImage(px: Array[Int], w: Int, h: Int): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, w, h, px, 0, w)
    img
  }

  // Writer lookup + instantiation dominates encode cost for small images —
  // reuse per executor thread (javax.imageio writers are single-threaded but
  // reusable across writes). PNG goes through encodePngFast (the imageio
  // PNG writer is ~9× slower and does not thread-scale), so only the JPEG
  // writer is pooled.
  private val jpegWriter = ThreadLocal.withInitial[javax.imageio.ImageWriter](() =>
    ImageIO.getImageWritersByFormatName("jpeg").next())

  /** Minimal standards-compliant PNG encoder (8-bit RGB, filter 0, one
    * IDAT) over a reused Deflater — javax.imageio's PNG writer contends
    * across threads (measured: 1.6k imgs/s at 32 threads vs 1.6k at 1);
    * this path scales with cores. Output decodes with any PNG reader
    * (round-trip tested against ImageIO). */
  private val deflater = ThreadLocal.withInitial[java.util.zip.Deflater](() =>
    new java.util.zip.Deflater(6))

  def encodePngFast(px: Array[Int], w: Int, h: Int): Array[Byte] = {
    // raw scanlines: filter byte 0 + RGB triples
    val raw = new Array[Byte](h * (1 + w * 3))
    var i = 0
    var y = 0
    while (y < h) {
      raw(i) = 0; i += 1
      var x = 0
      while (x < w) {
        val p = px(y * w + x)
        raw(i) = ((p >> 16) & 255).toByte
        raw(i + 1) = ((p >> 8) & 255).toByte
        raw(i + 2) = (p & 255).toByte
        i += 3; x += 1
      }
      y += 1
    }
    val d = deflater.get()
    d.reset()
    d.setInput(raw)
    d.finish()
    val comp = new ByteArrayOutputStream(raw.length / 2 + 64)
    val buf = new Array[Byte](8192)
    while (!d.finished()) {
      val n = d.deflate(buf)
      comp.write(buf, 0, n)
    }
    val idat = comp.toByteArray
    val out = new ByteArrayOutputStream(idat.length + 64)
    out.write(Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a))
    def chunk(tag: String, body: Array[Byte]): Unit = {
      val len = body.length
      out.write(Array[Byte]((len >>> 24).toByte, (len >>> 16).toByte,
        (len >>> 8).toByte, len.toByte))
      val crc = new java.util.zip.CRC32()
      val tagB = tag.getBytes("US-ASCII")
      crc.update(tagB); crc.update(body)
      out.write(tagB); out.write(body)
      val c = crc.getValue
      out.write(Array[Byte]((c >>> 24).toByte, (c >>> 16).toByte,
        (c >>> 8).toByte, c.toByte))
    }
    val ihdr = java.nio.ByteBuffer.allocate(13)
    ihdr.putInt(w).putInt(h)
    ihdr.put(8.toByte)  // bit depth
    ihdr.put(2.toByte)  // color type: truecolor RGB
    ihdr.put(0.toByte).put(0.toByte).put(0.toByte) // deflate, filter 0, no interlace
    chunk("IHDR", ihdr.array())
    chunk("IDAT", idat)
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }

  def encode(px: Array[Int], w: Int, h: Int, fmt: String): Array[Byte] = {
    if (fmt == "png") return encodePngFast(px, w, h)
    val img = toBufferedImage(px, w, h)
    val bos = new ByteArrayOutputStream()
    val out = new MemoryCacheImageOutputStream(bos)
    fmt match {
      case "jpeg" =>
        val wr = jpegWriter.get()
        val param = wr.getDefaultWriteParam
        param.setCompressionMode(ImageWriteParam.MODE_EXPLICIT)
        // 0.98: smooth synthetic gradients stay comfortably above the 40 dB
        // PSNR invariant (0.95 measured 39.6 dB on the sharpest pattern)
        param.setCompressionQuality(0.98f)
        wr.setOutput(out)
        wr.write(null, new IIOImage(img, null, null), param)
      case other => throw new IllegalArgumentException(s"unsupported format: $other")
    }
    out.flush()
    bos.toByteArray
  }

  /** Decode ONCE to (packed RGB ints row-major, width, height) — the hot
    * paths (phash, reencode) derive everything from this single decode. */
  def decodeAll(bytes: Array[Byte]): (Array[Int], Int, Int) = {
    val img = ImageIO.read(new ByteArrayInputStream(bytes))
    require(img != null, "undecodable image bytes")
    val w = img.getWidth; val h = img.getHeight
    val px = new Array[Int](w * h)
    img.getRGB(0, 0, w, h, px, 0, w)
    var i = 0
    while (i < px.length) { px(i) = px(i) & 0xffffff; i += 1 }
    (px, w, h)
  }

  /** Decode to packed RGB ints (row-major). */
  def decodeRgb(bytes: Array[Byte]): Array[Int] = decodeAll(bytes)._1

  /** Header-only (width, height): no pixel raster decode, and a clear
    * error on undecodable bytes instead of an executor NPE. */
  def dims(bytes: Array[Byte]): (Int, Int) = {
    val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
    try {
      val readers = ImageIO.getImageReaders(iis)
      require(readers.hasNext, "undecodable image bytes")
      val r = readers.next()
      try { r.setInput(iis); (r.getWidth(0), r.getHeight(0)) }
      finally r.dispose()
    } finally iis.close()
  }

  def width(bytes: Array[Byte]): Int = dims(bytes)._1
  def height(bytes: Array[Byte]): Int = dims(bytes)._2

  /** PSNR (dB) between two decoded images over RGB channels; identical
    * pixels → capped at 99.0 (srai-style allclose ⇒ "infinite"). */
  def psnr(a: Array[Byte], b: Array[Byte]): Double = {
    val (pa, wa, ha) = decodeAll(a); val (pb, wb, hb) = decodeAll(b)
    // equal LENGTH is not equal SHAPE: 2×8 vs 4×4 would compare pixels at
    // different spatial positions and return a meaningless value
    require(wa == wb && ha == hb,
      s"image size mismatch: ${wa}x$ha vs ${wb}x$hb")
    var se = 0.0
    var i = 0
    while (i < pa.length) {
      val x = pa(i); val y = pb(i)
      val dr = ((x >> 16) & 255) - ((y >> 16) & 255)
      val dg = ((x >> 8) & 255) - ((y >> 8) & 255)
      val db = (x & 255) - (y & 255)
      se += dr * dr + dg * dg + db * db
      i += 1
    }
    val mse = se / (pa.length * 3.0)
    if (mse == 0.0) 99.0
    else math.min(99.0, 10.0 * math.log10(255.0 * 255.0 / mse))
  }

  /** 64-bit average perceptual hash: grayscale → 8×8 area mean → bit per
    * cell above global mean (public aHash scheme). */
  def phash(bytes: Array[Byte]): Long = {
    val (px, w, h) = decodeAll(bytes)
    phashOfPixels(px, w, h)
  }

  def phashOfPixels(px: Array[Int], w: Int, h: Int): Long = {
    val grid = new Array[Double](64)
    val cnt = new Array[Int](64)
    var y = 0
    while (y < h) {
      val gy = math.min(7, y * 8 / h)
      var x = 0
      while (x < w) {
        val gx = math.min(7, x * 8 / w)
        val p = px(y * w + x)
        val gray = 0.299 * ((p >> 16) & 255) + 0.587 * ((p >> 8) & 255) + 0.114 * (p & 255)
        grid(gy * 8 + gx) += gray
        cnt(gy * 8 + gx) += 1
        x += 1
      }
      y += 1
    }
    var i = 0
    var mean = 0.0
    while (i < 64) { grid(i) /= math.max(1, cnt(i)); mean += grid(i); i += 1 }
    mean /= 64
    var bits = 0L
    i = 0
    while (i < 64) { if (grid(i) > mean) bits |= (1L << i); i += 1 }
    bits
  }

  /** Hamming distance between two 64-bit hashes. */
  def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  /** Area-average resize (box filter) — the multimodal feature-extraction
    * shape: decode once, integrate source pixels per target cell, re-encode.
    * Exact for integer downscale factors, well-defined for any target. */
  def resize(bytes: Array[Byte], tw: Int, th: Int, fmt: String): Array[Byte] = {
    require(tw > 0 && th > 0, "target dims must be positive")
    val (px, w, h) = decodeAll(bytes)
    val out = new Array[Int](tw * th)
    var ty = 0
    while (ty < th) {
      val y0 = ty * h / th; val y1 = math.max(y0 + 1, (ty + 1) * h / th)
      var tx = 0
      while (tx < tw) {
        val x0 = tx * w / tw; val x1 = math.max(x0 + 1, (tx + 1) * w / tw)
        var r = 0L; var g = 0L; var b = 0L; var n = 0
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) {
            val p = px(y * w + x)
            r += (p >> 16) & 255; g += (p >> 8) & 255; b += p & 255; n += 1
            x += 1
          }
          y += 1
        }
        out(ty * tw + tx) = (((r / n).toInt & 255) << 16) |
          (((g / n).toInt & 255) << 8) | ((b / n).toInt & 255)
        tx += 1
      }
      ty += 1
    }
    encode(out, tw, th, fmt)
  }

  /** Re-encode decoded pixels in another format (tile-sink path, L6/L7). */
  def reencode(bytes: Array[Byte], fmt: String): Array[Byte] = {
    val (px, w, h) = decodeAll(bytes)
    encode(px, w, h, fmt)
  }

  // ---- synthetic-table kernels (graft.sources.Images columns) ----
  // One home for the key→image derivation so the Catalyst projection
  // (img_synth / img_synth_phash) and the driver-side Images.row helper can
  // never drift: pattern = k % patterns, w = 32 + (pattern % 3)·16, h = 32,
  // fmt = jpeg when pattern % 4 == 0 (stored grayscale — see toGray) else
  // png. Exposing the columns as separate expressions is what lets column
  // pruning drop the encode entirely for key-only consumers.

  private def synthRaster(k: Long, patterns: Int): (Array[Int], Int, Int, String) = {
    require(k >= 0, s"image key must be non-negative, got $k")
    val pat = k % patterns
    val w = 32 + (pat % 3).toInt * 16
    val h = 32
    val fmt = if (pat % 4 == 0) "jpeg" else "png"
    val colorPx = synthPixels(pat, w, h)
    val px = if (fmt == "jpeg") toGray(colorPx) else colorPx
    (px, w, h, fmt)
  }

  /** Encoded bytes of the synthetic image for key `k` — byte-identical to
    * the historical Images.row path (same raster, same encoder). */
  def synthBytes(k: Long, patterns: Int): Array[Byte] = {
    val (px, w, h, fmt) = synthRaster(k, patterns)
    encode(px, w, h, fmt)
  }

  /** Perceptual hash of the synthetic image for key `k` (hash of the
    * PRE-encode raster, as Images.row always computed it). */
  def synthPhash(k: Long, patterns: Int): Long = {
    val (px, w, h, _) = synthRaster(k, patterns)
    phashOfPixels(px, w, h)
  }
}
