package graft.io

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}
import java.util.zip.{CRC32, Deflater, Inflater}

/** Histogram image sinks — the tiff/png branches of the reference's
  * `saveDict` (`fprocessing.py:859-980`). The sandbox has no imaging
  * codecs, but neither format needs one here: TIFF supports uncompressed
  * float32 strips natively, and PNG's only compression is zlib, which
  * the JDK ships (`java.util.zip`). Both writers emit the minimal
  * single-image form of their published specs (TIFF 6.0 baseline +
  * SampleFormat; PNG 16-bit grayscale, filter 0).
  */
object ImageSinks {

  // ---------------------------------------------------------------- TIFF

  private val TIFF_TAGS = 8 // number of IFD entries we write

  /** Write a 2D grid as a single-strip uncompressed float32 grayscale
    * TIFF (little-endian). */
  def writeTiffGray32f(path: String, img: Array[Array[Double]]): Unit = {
    val rows = img.length
    val cols = img(0).length
    val dataSize = rows * cols * 4
    val ifdOffset = 8
    val ifdSize = 2 + TIFF_TAGS * 12 + 4
    val dataOffset = ifdOffset + ifdSize
    val out = ByteBuffer.allocate(dataOffset + dataSize).order(ByteOrder.LITTLE_ENDIAN)
    out.putShort(0, 0x4949.toShort) // "II" little-endian
    out.putShort(2, 42)
    out.putInt(4, ifdOffset)
    out.position(ifdOffset)
    out.putShort(TIFF_TAGS.toShort)
    def tag(id: Int, typ: Int, count: Int, value: Int): Unit = {
      out.putShort(id.toShort); out.putShort(typ.toShort); out.putInt(count); out.putInt(value)
    }
    tag(256, 4, 1, cols)       // ImageWidth LONG
    tag(257, 4, 1, rows)       // ImageLength LONG
    tag(258, 3, 1, 32)         // BitsPerSample SHORT
    tag(259, 3, 1, 1)          // Compression = none
    tag(262, 3, 1, 1)          // Photometric = BlackIsZero
    tag(273, 4, 1, dataOffset) // StripOffsets
    tag(279, 4, 1, dataSize)   // StripByteCounts
    tag(339, 3, 1, 3)          // SampleFormat = IEEE float
    out.putInt(0)              // next IFD = none
    var i = 0
    while (i < rows) {
      var j = 0
      while (j < cols) { out.putFloat(img(i)(j).toFloat); j += 1 }
      i += 1
    }
    Files.write(Paths.get(path), out.array())
  }

  /** Minimal reader for the TIFFs [[writeTiffGray32f]] produces (and any
    * single-strip uncompressed float32 grayscale LE TIFF) — used for
    * round-trip verification and grid reload. */
  def readTiffGray32f(path: String): Array[Array[Double]] = {
    val bytes = Files.readAllBytes(Paths.get(path))
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    require(bb.getShort(0) == 0x4949.toShort && bb.getShort(2) == 42, "not a LE TIFF")
    val ifd = bb.getInt(4)
    val n = bb.getShort(ifd)
    var (rows, cols, strip) = (0, 0, 0)
    var (compression, sampleFormat, bits) = (1, 1, 32)
    for (k <- 0 until n) {
      val off = ifd + 2 + k * 12
      val id = bb.getShort(off) & 0xffff
      val typ = bb.getShort(off + 2) & 0xffff
      val v = if (typ == 3) bb.getShort(off + 8) & 0xffff else bb.getInt(off + 8)
      id match {
        case 256 => cols = v
        case 257 => rows = v
        case 258 => bits = v
        case 259 => compression = v
        case 273 => strip = v
        case 339 => sampleFormat = v
        case _ =>
      }
    }
    require(compression == 1 && sampleFormat == 3 && bits == 32,
      s"only uncompressed float32 supported (comp=$compression fmt=$sampleFormat bits=$bits)")
    Array.tabulate(rows, cols)((i, j) => bb.getFloat(strip + (i * cols + j) * 4).toDouble)
  }

  // ----------------------------------------------------------------- PNG

  private val PNG_SIG = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)

  private def chunk(name: String, payload: Array[Byte]): Array[Byte] = {
    val out = ByteBuffer.allocate(12 + payload.length).order(ByteOrder.BIG_ENDIAN)
    out.putInt(payload.length)
    out.put(name.getBytes("US-ASCII"))
    out.put(payload)
    val crc = new CRC32()
    crc.update(name.getBytes("US-ASCII"))
    crc.update(payload)
    out.putInt(crc.getValue.toInt)
    out.array()
  }

  /** Write a 2D grid as a 16-bit grayscale PNG, linearly scaled from
    * [min, max] to [0, 65535] (the standard intensity export; the scale
    * is the caller's to record — the reference's png branch does the
    * same lossy normalization). */
  def writePng16Gray(path: String, img: Array[Array[Double]]): Unit = {
    val rows = img.length
    val cols = img(0).length
    val flat = img.flatten
    val lo = flat.min
    val hi = flat.max
    val scale = if (hi > lo) 65535.0 / (hi - lo) else 0.0
    val ihdr = ByteBuffer.allocate(13).order(ByteOrder.BIG_ENDIAN)
    ihdr.putInt(cols).putInt(rows)
    ihdr.put(16.toByte)       // bit depth
    ihdr.put(0.toByte)        // color type: grayscale
    ihdr.put(0.toByte).put(0.toByte).put(0.toByte) // deflate/adaptive/no-interlace
    // raw scanlines: filter byte 0 + big-endian u16 samples
    val raw = ByteBuffer.allocate(rows * (1 + cols * 2)).order(ByteOrder.BIG_ENDIAN)
    var i = 0
    while (i < rows) {
      raw.put(0.toByte)
      var j = 0
      while (j < cols) {
        raw.putShort(math.round((img(i)(j) - lo) * scale).toInt.toShort)
        j += 1
      }
      i += 1
    }
    val deflater = new Deflater()
    deflater.setInput(raw.array()); deflater.finish()
    val comp = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!deflater.finished()) comp.write(buf, 0, deflater.deflate(buf))
    deflater.end()
    val out = new java.io.ByteArrayOutputStream()
    out.write(PNG_SIG)
    out.write(chunk("IHDR", ihdr.array()))
    out.write(chunk("IDAT", comp.toByteArray))
    out.write(chunk("IEND", Array.empty))
    Files.write(Paths.get(path), out.toByteArray)
  }

  /** Minimal reader for [[writePng16Gray]] output (16-bit grayscale,
    * filter 0), verifying chunk CRCs — round-trip check only. */
  def readPng16Gray(path: String): Array[Array[Int]] = {
    val bytes = Files.readAllBytes(Paths.get(path))
    require(bytes.take(8).sameElements(PNG_SIG), "not a PNG")
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
    var off = 8
    var rows = 0; var cols = 0
    val idat = new java.io.ByteArrayOutputStream()
    while (off < bytes.length) {
      val len = bb.getInt(off)
      val name = new String(bytes, off + 4, 4, "US-ASCII")
      val crc = new CRC32()
      crc.update(bytes, off + 4, 4 + len)
      require(crc.getValue.toInt == bb.getInt(off + 8 + len), s"bad CRC in $name")
      name match {
        case "IHDR" =>
          cols = bb.getInt(off + 8); rows = bb.getInt(off + 12)
          require(bytes(off + 16) == 16 && bytes(off + 17) == 0, "not 16-bit grayscale")
        case "IDAT" => idat.write(bytes, off + 8, len)
        case _ =>
      }
      off += 12 + len
    }
    val inflater = new Inflater()
    inflater.setInput(idat.toByteArray)
    val raw = new Array[Byte](rows * (1 + cols * 2))
    var done = 0
    while (done < raw.length && !inflater.finished())
      done += inflater.inflate(raw, done, raw.length - done)
    inflater.end()
    val rb = ByteBuffer.wrap(raw).order(ByteOrder.BIG_ENDIAN)
    Array.tabulate(rows, cols) { (i, j) =>
      require(raw(i * (1 + cols * 2)) == 0, "only filter 0 supported")
      rb.getShort(i * (1 + cols * 2) + 1 + j * 2) & 0xffff
    }
  }
}
