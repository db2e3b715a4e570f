package graft.functions

import java.nio.{ByteBuffer, ByteOrder}

/** Pure-JVM baseline JPEG (ITU T.81 sequential DCT, Huffman): a real
  * encoder and decoder for the format most web images actually use —
  * 8-bit grayscale (1 component) and 4:4:4 color (3 components, no
  * chroma subsampling), with the spec's Annex K example quantization
  * and Huffman tables on the encode side and fully general table
  * parsing on the decode side (DQT/DHT/SOF0/DRI/SOS marker walk,
  * byte-stuffed entropy stream, restart markers, canonical Huffman
  * decode, dequantization, exact double-precision IDCT).
  *
  * Scope contract (everything else quarantines to None): baseline SOF0
  * and progressive SOF2 frames — progressive DECODE implements the full
  * T.81 Annex G Huffman procedures (spectral selection, successive
  * approximation with DC/AC refinement scans, EOB runs spanning blocks)
  * because progressive is a double-digit share of web JPEGs and a
  * corpus image pipeline that drops them all has a silent coverage
  * hole; the encode side stays baseline (plus the progressive fixture
  * emitters tests and oracles drive). No arithmetic coding, no 12-bit;
  * sampling factors 1 or 2 per axis, which covers grayscale, 4:4:4,
  * 4:2:2 and 4:2:0 (the layout most web JPEGs actually use — MCU =
  * 4 luma blocks + 1 Cb + 1 Cr, chroma upsampled by replication).
  * That covers every file this library's own encoders write and the
  * overwhelming share of web JPEGs; unsupported files drop rather than
  * decode wrongly.
  *
  * Exactness note the oracles build on: JPEG is lossy in general, but a
  * FLAT 8×8 block of value `v` has DC = 8·(v−128) and zero AC, so when
  * `v` is even (8·(v−128) divisible by the Annex K luminance Q₀₀ = 16)
  * the quantize/dequantize roundtrip is exact and the decoded block is
  * bit-equal to the source — an analytically replayable fixture through
  * a REAL lossy codec.
  */
object JpegCodec {

  // ------------------------------------------------------------- tables --

  /** Zigzag scan: zz(k) = natural (row-major) index of the k-th
    * zigzag-ordered coefficient (T.81 Figure 5).
    */
  private[functions] val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  /** Annex K.1 luminance quantization table (natural order). */
  private[functions] val QuantLuma: Array[Int] = Array(
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99)

  /** Annex K.2 chrominance quantization table (natural order). */
  private[functions] val QuantChroma: Array[Int] = Array(
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99)

  // Annex K.3 example Huffman tables: (bit-length counts L1..L16, symbols)
  private val DcLumaCounts = Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val DcLumaSyms = (0 to 11).map(_.toByte).toArray
  private val DcChromaCounts = Array(0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0)
  private val DcChromaSyms = (0 to 11).map(_.toByte).toArray
  private val AcLumaCounts = Array(0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d)
  private val AcLumaSyms: Array[Byte] = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08,
    0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0a, 0x16, 0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3a, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3,
    0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6,
    0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9,
    0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
    0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf1, 0xf2, 0xf3, 0xf4,
    0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa).map(_.toByte)
  private val AcChromaCounts = Array(0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77)
  private val AcChromaSyms: Array[Byte] = Array(
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xa1, 0xb1, 0xc1, 0x09, 0x23, 0x33, 0x52, 0xf0, 0x15, 0x62, 0x72, 0xd1,
    0x0a, 0x16, 0x24, 0x34, 0xe1, 0x25, 0xf1, 0x17, 0x18, 0x19, 0x1a, 0x26,
    0x27, 0x28, 0x29, 0x2a, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3a, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7a, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a,
    0xa2, 0xa3, 0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4,
    0xb5, 0xb6, 0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7,
    0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda,
    0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf2, 0xf3, 0xf4,
    0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa).map(_.toByte)

  /** Canonical Huffman codes from (counts, symbols): symbol → (code, len). */
  private def buildEncodeTable(counts: Array[Int], syms: Array[Byte]): Array[(Int, Int)] = {
    val table = new Array[(Int, Int)](256)
    var code = 0
    var k = 0
    var len = 1
    while (len <= 16) {
      var i = 0
      while (i < counts(len - 1)) {
        table(syms(k) & 0xff) = (code, len)
        code += 1; k += 1; i += 1
      }
      code <<= 1
      len += 1
    }
    table
  }

  /** Canonical decode tables (T.81 F.2.2.3): per length, the min code,
    * max code (−1 when the length is unused) and the index of its first
    * symbol.
    */
  private final class DecodeTable(counts: Array[Int], val syms: Array[Byte]) {
    val minCode = new Array[Int](17)
    val maxCode = Array.fill(17)(-1)
    val valPtr = new Array[Int](17)
    locally {
      var code = 0
      var k = 0
      var len = 1
      while (len <= 16) {
        if (counts(len - 1) > 0) {
          valPtr(len) = k
          minCode(len) = code
          code += counts(len - 1); k += counts(len - 1)
          maxCode(len) = code - 1
        }
        code <<= 1
        len += 1
      }
    }
  }

  // -------------------------------------------------------- DCT kernels --

  private val CosTab: Array[Double] =
    Array.tabulate(8, 8) { (x, u) => math.cos((2 * x + 1) * u * math.Pi / 16) }.flatten
  @inline private def cosv(x: Int, u: Int): Double = CosTab(x * 8 + u)
  @inline private def c0(u: Int): Double = if (u == 0) 0.7071067811865476 else 1.0

  /** Forward 8×8 DCT of level-shifted samples (natural order). */
  private def fdct(in: Array[Double]): Array[Double] = {
    val out = new Array[Double](64)
    var u = 0
    while (u < 8) {
      var v = 0
      while (v < 8) {
        var s = 0.0
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 8) {
            s += in(y * 8 + x) * cosv(x, v) * cosv(y, u)
            x += 1
          }
          y += 1
        }
        out(u * 8 + v) = 0.25 * c0(u) * c0(v) * s
        v += 1
      }
      u += 1
    }
    out
  }

  /** Inverse 8×8 DCT (natural order in, spatial samples out). */
  private def idct(in: Array[Int]): Array[Double] = {
    val out = new Array[Double](64)
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0
        var u = 0
        while (u < 8) {
          var v = 0
          while (v < 8) {
            val f = in(u * 8 + v)
            if (f != 0) s += c0(u) * c0(v) * f * cosv(x, v) * cosv(y, u)
            v += 1
          }
          u += 1
        }
        out(y * 8 + x) = 0.25 * s
        x += 1
      }
      y += 1
    }
    out
  }

  // ---------------------------------------------------------- bit writer --

  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0
    private var nBits = 0
    def put(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        acc = (acc << 1) | ((code >> i) & 1)
        nBits += 1
        if (nBits == 8) {
          out.write(acc)
          if (acc == 0xff) out.write(0x00) // byte stuffing
          acc = 0; nBits = 0
        }
        i -= 1
      }
    }
    /** Pad the final partial byte with 1-bits (T.81 F.1.2.3). */
    def flush(): Unit = if (nBits > 0) {
      acc = (acc << (8 - nBits)) | ((1 << (8 - nBits)) - 1)
      out.write(acc)
      if (acc == 0xff) out.write(0x00)
      acc = 0; nBits = 0
    }
  }

  @inline private def category(v: Int): Int = {
    var a = math.abs(v)
    var t = 0
    while (a != 0) { a >>= 1; t += 1 }
    t
  }

  // ------------------------------------------------------------- encoder --

  /** Encode one component's blocks; `blocks` in MCU order, each 64
    * level-shifted spatial samples (natural order). Returns nothing —
    * writes into `bw`. DC predictor threaded by the caller.
    */
  private def encodeBlock(
      bw: BitWriter,
      samples: Array[Double],
      quant: Array[Int],
      dcTab: Array[(Int, Int)],
      acTab: Array[(Int, Int)],
      pred: Int): Int = {
    val f = fdct(samples)
    val q = new Array[Int](64)
    var i = 0
    while (i < 64) { q(i) = Math.round(f(i) / quant(i)).toInt; i += 1 }
    // DC
    val diff = q(0) - pred
    val t = category(diff)
    val (dc, dl) = dcTab(t)
    bw.put(dc, dl)
    if (t > 0) bw.put(if (diff >= 0) diff else diff + (1 << t) - 1, t)
    // AC, zigzag with run-length/EOB
    var run = 0
    var k = 1
    while (k < 64) {
      val v = q(Zigzag(k))
      if (v == 0) run += 1
      else {
        while (run >= 16) { val (z, zl) = acTab(0xf0); bw.put(z, zl); run -= 16 }
        val s = category(v)
        val (c, cl) = acTab((run << 4) | s)
        bw.put(c, cl)
        bw.put(if (v >= 0) v else v + (1 << s) - 1, s)
        run = 0
      }
      k += 1
    }
    if (run > 0) { val (e, el) = acTab(0x00); bw.put(e, el) }
    q(0)
  }

  private def seg(out: java.io.ByteArrayOutputStream, marker: Int, body: Array[Byte]): Unit = {
    out.write(0xff); out.write(marker)
    val len = body.length + 2
    out.write((len >> 8) & 0xff); out.write(len & 0xff)
    out.write(body)
  }

  private def dqtBody(id: Int, q: Array[Int]): Array[Byte] = {
    val b = new Array[Byte](65)
    b(0) = id.toByte // 8-bit precision, table id
    var k = 0
    while (k < 64) { b(1 + k) = q(Zigzag(k)).toByte; k += 1 }
    b
  }

  private def dhtBody(cls: Int, id: Int, counts: Array[Int], syms: Array[Byte]): Array[Byte] = {
    val b = new Array[Byte](1 + 16 + syms.length)
    b(0) = ((cls << 4) | id).toByte
    var i = 0
    while (i < 16) { b(1 + i) = counts(i).toByte; i += 1 }
    System.arraycopy(syms, 0, b, 17, syms.length)
    b
  }

  /** Edge-replicated level-shifted 8×8 block of one channel. `get(x, y)`
    * must accept any in-image coordinate.
    */
  private def block(bx: Int, by: Int, w: Int, h: Int, get: (Int, Int) => Int): Array[Double] = {
    val out = new Array[Double](64)
    var y = 0
    while (y < 8) {
      val sy = math.min(by * 8 + y, h - 1)
      var x = 0
      while (x < 8) {
        val sx = math.min(bx * 8 + x, w - 1)
        out(y * 8 + x) = get(sx, sy) - 128.0
        x += 1
      }
      y += 1
    }
    out
  }

  /** Baseline GRAYSCALE JPEG (1 component, Annex K luminance tables).
    * `pixels` are w·h gray bytes row-major top-down, cycled/zero-padded
    * like the other synthetic writers; edges replicate into partial
    * blocks. Output opens in any viewer.
    */
  private val Jfif: Array[Byte] =
    "JFIF".getBytes("US-ASCII") ++ Array[Byte](0, 1, 1, 0, 0, 1, 0, 1, 0, 0)

  def encodeGray(
      width: Int,
      height: Int,
      pixels: Array[Byte],
      restartInterval: Int = 0): Array[Byte] = {
    require(width > 0 && height > 0, "jpeg dimensions must be positive")
    require(width <= 65535 && height <= 65535, "jpeg dimensions exceed 16 bits")
    require(restartInterval >= 0 && restartInterval <= 65535,
      s"restartInterval out of range: $restartInterval")
    def px(x: Int, y: Int): Int =
      if (pixels.isEmpty) 0 else pixels((y * width + x) % pixels.length) & 0xff
    val out = new java.io.ByteArrayOutputStream()
    out.write(0xff); out.write(0xd8) // SOI
    seg(out, 0xe0, Jfif)
    seg(out, 0xdb, dqtBody(0, QuantLuma))
    seg(out, 0xc0, Array[Byte](8,
      ((height >> 8) & 0xff).toByte, (height & 0xff).toByte,
      ((width >> 8) & 0xff).toByte, (width & 0xff).toByte,
      1, 1, 0x11, 0))
    seg(out, 0xc4, dhtBody(0, 0, DcLumaCounts, DcLumaSyms))
    seg(out, 0xc4, dhtBody(1, 0, AcLumaCounts, AcLumaSyms))
    if (restartInterval > 0)
      seg(out, 0xdd, Array[Byte](((restartInterval >> 8) & 0xff).toByte,
        (restartInterval & 0xff).toByte))
    seg(out, 0xda, Array[Byte](1, 1, 0x00, 0, 63, 0))
    val dcT = buildEncodeTable(DcLumaCounts, DcLumaSyms)
    val acT = buildEncodeTable(AcLumaCounts, AcLumaSyms)
    val bw = new BitWriter(out)
    val bxN = (width + 7) / 8
    val byN = (height + 7) / 8
    var pred = 0
    var rst = 0
    var mcu = 0
    val nMcu = bxN * byN
    while (mcu < nMcu) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        bw.flush() // byte-align with 1-padding, then the RSTn marker
        out.write(0xff); out.write(0xd0 + rst)
        rst = (rst + 1) % 8
        pred = 0
      }
      pred = encodeBlock(bw,
        block(mcu % bxN, mcu / bxN, width, height, px), QuantLuma, dcT, acT, pred)
      mcu += 1
    }
    bw.flush()
    out.write(0xff); out.write(0xd9) // EOI
    out.toByteArray
  }

  /** Baseline 4:4:4 COLOR JPEG (3 components, no subsampling, Annex K
    * tables). `rgb` is 3·w·h bytes row-major top-down (cycled/padded);
    * JFIF YCbCr conversion. Gray pixels (R=G=B) convert exactly
    * (Y = v, Cb = Cr = 128), which is what keeps the flat-gray fixture
    * analytic through the color path too.
    */
  def encodeColor444(width: Int, height: Int, rgb: Array[Byte]): Array[Byte] = {
    require(width > 0 && height > 0, "jpeg dimensions must be positive")
    require(width <= 65535 && height <= 65535, "jpeg dimensions exceed 16 bits")
    def ch(x: Int, y: Int, c: Int): Int =
      if (rgb.isEmpty) 0 else rgb((3 * (y * width + x) + c) % rgb.length) & 0xff
    def yb(x: Int, y: Int): Int = {
      val r = ch(x, y, 0); val g = ch(x, y, 1); val b = ch(x, y, 2)
      Math.round(0.299 * r + 0.587 * g + 0.114 * b).toInt
    }
    def cb(x: Int, y: Int): Int = {
      val r = ch(x, y, 0); val g = ch(x, y, 1); val b = ch(x, y, 2)
      Math.round(128 - 0.168736 * r - 0.331264 * g + 0.5 * b).toInt
    }
    def cr(x: Int, y: Int): Int = {
      val r = ch(x, y, 0); val g = ch(x, y, 1); val b = ch(x, y, 2)
      Math.round(128 + 0.5 * r - 0.418688 * g - 0.081312 * b).toInt
    }
    val out = new java.io.ByteArrayOutputStream()
    out.write(0xff); out.write(0xd8)
    seg(out, 0xe0, Jfif)
    seg(out, 0xdb, dqtBody(0, QuantLuma))
    seg(out, 0xdb, dqtBody(1, QuantChroma))
    seg(out, 0xc0, Array[Byte](8,
      ((height >> 8) & 0xff).toByte, (height & 0xff).toByte,
      ((width >> 8) & 0xff).toByte, (width & 0xff).toByte,
      3, 1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1))
    seg(out, 0xc4, dhtBody(0, 0, DcLumaCounts, DcLumaSyms))
    seg(out, 0xc4, dhtBody(1, 0, AcLumaCounts, AcLumaSyms))
    seg(out, 0xc4, dhtBody(0, 1, DcChromaCounts, DcChromaSyms))
    seg(out, 0xc4, dhtBody(1, 1, AcChromaCounts, AcChromaSyms))
    seg(out, 0xda, Array[Byte](3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0))
    val dcL = buildEncodeTable(DcLumaCounts, DcLumaSyms)
    val acL = buildEncodeTable(AcLumaCounts, AcLumaSyms)
    val dcC = buildEncodeTable(DcChromaCounts, DcChromaSyms)
    val acC = buildEncodeTable(AcChromaCounts, AcChromaSyms)
    val bw = new BitWriter(out)
    val bxN = (width + 7) / 8
    val byN = (height + 7) / 8
    var predY = 0; var predCb = 0; var predCr = 0
    var by = 0
    while (by < byN) {
      var bx = 0
      while (bx < bxN) {
        predY = encodeBlock(bw, block(bx, by, width, height, yb), QuantLuma, dcL, acL, predY)
        predCb = encodeBlock(bw, block(bx, by, width, height, cb), QuantChroma, dcC, acC, predCb)
        predCr = encodeBlock(bw, block(bx, by, width, height, cr), QuantChroma, dcC, acC, predCr)
        bx += 1
      }
      by += 1
    }
    bw.flush()
    out.write(0xff); out.write(0xd9)
    out.toByteArray
  }

  /** Baseline 4:2:0 COLOR JPEG — the subsampled layout most of the web
    * ships: MCUs are 16×16 with four luma blocks and one block per
    * chroma component, chroma downsampled by 2×2 AVERAGING (the
    * standard encoder choice; a flat plane averages to itself, which
    * keeps the flat-gray fixture analytic here too — gray pixels give
    * Cb = Cr = 128 flat at any subsampling). `rgb` as in
    * [[encodeColor444]].
    */
  def encodeColor420(width: Int, height: Int, rgb: Array[Byte]): Array[Byte] =
    encodeColorSub(width, height, rgb, 2, 2)

  /** Baseline 4:2:2 COLOR JPEG (luma 2×1, chroma halved horizontally
    * only) — the other subsampled layout in circulation; exists chiefly
    * so the decoder's generic sampling-factor path is exercised on a
    * factor pair no other writer produces.
    */
  def encodeColor422(width: Int, height: Int, rgb: Array[Byte]): Array[Byte] =
    encodeColorSub(width, height, rgb, 2, 1)

  /** The generalized subsampled encoder behind [[encodeColor420]] /
    * [[encodeColor422]]: luma at hs×vs blocks per MCU, each chroma
    * component one block per MCU from the hs×vs-box-averaged
    * half/quarter-resolution plane.
    */
  private def encodeColorSub(
      width: Int, height: Int, rgb: Array[Byte], hs: Int, vs: Int): Array[Byte] = {
    require(width > 0 && height > 0, "jpeg dimensions must be positive")
    require(width <= 65535 && height <= 65535, "jpeg dimensions exceed 16 bits")
    def ch(x: Int, y: Int, c: Int): Int = {
      val cx = math.min(x, width - 1); val cy = math.min(y, height - 1)
      if (rgb.isEmpty) 0 else rgb((3 * (cy * width + cx) + c) % rgb.length) & 0xff
    }
    def yb(x: Int, y: Int): Int = {
      val r = ch(x, y, 0); val g = ch(x, y, 1); val b = ch(x, y, 2)
      Math.round(0.299 * r + 0.587 * g + 0.114 * b).toInt
    }
    // chroma at REDUCED resolution: the hs×vs box average of the
    // full-res values (edge pixels replicate via the ch() clamp)
    def boxAvg(x: Int, y: Int, f: (Int, Int) => Double): Int = {
      var s = 0.0
      var j = 0
      while (j < vs) {
        var i = 0
        while (i < hs) { s += f(hs * x + i, vs * y + j); i += 1 }
        j += 1
      }
      Math.round(s / (hs * vs)).toInt
    }
    def cbHalf(x: Int, y: Int): Int = boxAvg(x, y, (px, py) => {
      val r = ch(px, py, 0); val g = ch(px, py, 1); val b = ch(px, py, 2)
      128 - 0.168736 * r - 0.331264 * g + 0.5 * b
    })
    def crHalf(x: Int, y: Int): Int = boxAvg(x, y, (px, py) => {
      val r = ch(px, py, 0); val g = ch(px, py, 1); val b = ch(px, py, 2)
      128 + 0.5 * r - 0.418688 * g - 0.081312 * b
    })
    val out = new java.io.ByteArrayOutputStream()
    out.write(0xff); out.write(0xd8)
    seg(out, 0xe0, Jfif)
    seg(out, 0xdb, dqtBody(0, QuantLuma))
    seg(out, 0xdb, dqtBody(1, QuantChroma))
    seg(out, 0xc0, Array[Byte](8,
      ((height >> 8) & 0xff).toByte, (height & 0xff).toByte,
      ((width >> 8) & 0xff).toByte, (width & 0xff).toByte,
      3, 1, ((hs << 4) | vs).toByte, 0, 2, 0x11, 1, 3, 0x11, 1))
    seg(out, 0xc4, dhtBody(0, 0, DcLumaCounts, DcLumaSyms))
    seg(out, 0xc4, dhtBody(1, 0, AcLumaCounts, AcLumaSyms))
    seg(out, 0xc4, dhtBody(0, 1, DcChromaCounts, DcChromaSyms))
    seg(out, 0xc4, dhtBody(1, 1, AcChromaCounts, AcChromaSyms))
    seg(out, 0xda, Array[Byte](3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0))
    val dcL = buildEncodeTable(DcLumaCounts, DcLumaSyms)
    val acL = buildEncodeTable(AcLumaCounts, AcLumaSyms)
    val dcC = buildEncodeTable(DcChromaCounts, DcChromaSyms)
    val acC = buildEncodeTable(AcChromaCounts, AcChromaSyms)
    val bw = new BitWriter(out)
    val subW = (width + hs - 1) / hs
    val subH = (height + vs - 1) / vs
    val mcusX = (width + 8 * hs - 1) / (8 * hs)
    val mcusY = (height + 8 * vs - 1) / (8 * vs)
    var predY = 0; var predCb = 0; var predCr = 0
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        // hs×vs luma blocks, raster order within the MCU
        var vi = 0
        while (vi < vs) {
          var hi = 0
          while (hi < hs) {
            predY = encodeBlock(bw,
              block(mx * hs + hi, my * vs + vi, width, height, yb),
              QuantLuma, dcL, acL, predY)
            hi += 1
          }
          vi += 1
        }
        predCb = encodeBlock(bw, block(mx, my, subW, subH, cbHalf),
          QuantChroma, dcC, acC, predCb)
        predCr = encodeBlock(bw, block(mx, my, subW, subH, crHalf),
          QuantChroma, dcC, acC, predCr)
        mx += 1
      }
      my += 1
    }
    bw.flush()
    out.write(0xff); out.write(0xd9)
    out.toByteArray
  }

  // ------------------------------------------------------------- decoder --

  /** Entropy-stream bit reader with 0xFF00 unstuffing; `hitMarker`
    * flips when a real marker (RST or terminating) is reached.
    */
  private final class BitReader(data: Array[Byte], var pos: Int) {
    private var acc = 0
    private var nBits = 0
    var badStream = false
    def align(): Unit = { acc = 0; nBits = 0 }
    /** Next marker byte if positioned at FF xx (xx != 0), else -1. */
    def markerAhead: Int =
      if (pos + 1 < data.length && (data(pos) & 0xff) == 0xff && data(pos + 1) != 0)
        data(pos + 1) & 0xff
      else -1
    def bit(): Int = {
      if (nBits == 0) {
        if (pos >= data.length) { badStream = true; return 0 }
        val b = data(pos) & 0xff
        if (b == 0xff) {
          if (pos + 1 < data.length && data(pos + 1) == 0) pos += 2 // stuffed
          else { badStream = true; return 0 } // real marker mid-symbol
          acc = 0xff
        } else { acc = b; pos += 1 }
        nBits = 8
      }
      nBits -= 1
      (acc >> nBits) & 1
    }
    def bits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }
  }

  private def decodeSymbol(br: BitReader, t: DecodeTable): Int = {
    var code = br.bit()
    var len = 1
    while (len <= 16) {
      if (t.maxCode(len) >= 0 && code <= t.maxCode(len))
        return t.syms(t.valPtr(len) + code - t.minCode(len)) & 0xff
      code = (code << 1) | br.bit()
      len += 1
    }
    br.badStream = true
    0
  }

  @inline private def extend(v: Int, t: Int): Int =
    if (t == 0) 0 else if (v < (1 << (t - 1))) v - (1 << t) + 1 else v

  /** `(width, height)` from the first SOF marker — the header-grain
    * triage read ([[decode]] without the entropy/IDCT cost): walk the
    * marker stream (standalone markers skipped, segment lengths
    * bounds-checked), stop at any SOFn frame header. None for
    * non-JPEG, a malformed marker walk, or a scan starting before any
    * SOF.
    */
  def dimensions(payload: Array[Byte]): Option[(Int, Int)] = {
    if (payload == null || payload.length < 4 ||
      (payload(0) & 0xff) != 0xff || (payload(1) & 0xff) != 0xd8) return None
    var p = 2
    while (p + 4 <= payload.length) {
      if ((payload(p) & 0xff) != 0xff) return None
      val m = payload(p + 1) & 0xff
      if (m == 0xd8 || (m >= 0xd0 && m <= 0xd7) || m == 0x01) p += 2
      else {
        val len = ((payload(p + 2) & 0xff) << 8) | (payload(p + 3) & 0xff)
        if (len < 2 || p + 2 + len > payload.length) return None
        if (m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc) {
          if (len < 7) return None
          val h = ((payload(p + 5) & 0xff) << 8) | (payload(p + 6) & 0xff)
          val w = ((payload(p + 7) & 0xff) << 8) | (payload(p + 8) & 0xff)
          return if (w > 0 && h > 0) Some((w, h)) else None
        }
        if (m == 0xda) return None // scan before any SOF: malformed
        p += 2 + len
      }
    }
    None
  }

  /** Decode a baseline JPEG: `(width, height, channels, pixels)` with
    * channels 1 (gray bytes) or 3 (RGB bytes), row-major top-down.
    * Anything outside the scope contract — or any corruption (bad
    * marker structure, truncated entropy stream, undefined table
    * references, coefficient index overruns) — quarantines (None).
    */
  def decode(
      payload: Array[Byte],
      maxBytes: Int = 1 << 26): Option[(Int, Int, Int, Array[Byte])] = {
    if (payload == null || payload.length < 4 ||
      (payload(0) & 0xff) != 0xff || (payload(1) & 0xff) != 0xd8) return None
    val quant = new Array[Array[Int]](4)
    val dcTabs = new Array[DecodeTable](4)
    val acTabs = new Array[DecodeTable](4)
    var w = -1; var h = -1
    var nComp = 0
    val compQ = new Array[Int](3) // quant table id per component
    val compId = new Array[Int](3)
    var restartInterval = 0
    var progressive = false
    var pos = 2
    val compH = new Array[Int](3)
    val compV = new Array[Int](3)
    def u16(p: Int): Int = ((payload(p) & 0xff) << 8) | (payload(p + 1) & 0xff)
    // ---- marker segments up to SOS
    var sosAt = -1
    val compDc = new Array[Int](3)
    val compAc = new Array[Int](3)
    while (sosAt < 0) {
      if (pos + 4 > payload.length) return None
      if ((payload(pos) & 0xff) != 0xff) return None
      val marker = payload(pos + 1) & 0xff
      if (marker == 0xd8 || marker == 0xd9) return None // stray SOI / early EOI
      val len = u16(pos + 2)
      if (len < 2 || pos + 2 + len > payload.length) return None
      val body = pos + 4
      val bodyLen = len - 2
      marker match {
        case 0xdb => // DQT: one or more tables
          var p = body
          while (p < body + bodyLen) {
            val pq = (payload(p) >> 4) & 0x0f
            val tq = payload(p) & 0x0f
            if (pq != 0 || tq > 3 || p + 65 > body + bodyLen) return None // 8-bit only
            val t = new Array[Int](64)
            var k = 0
            while (k < 64) { t(Zigzag(k)) = payload(p + 1 + k) & 0xff; k += 1 }
            quant(tq) = t
            p += 65
          }
        case 0xc4 => // DHT: one or more tables
          var p = body
          while (p < body + bodyLen) {
            if (p + 17 > body + bodyLen) return None
            val tc = (payload(p) >> 4) & 0x0f
            val th = payload(p) & 0x0f
            if (tc > 1 || th > 3) return None
            val counts = Array.tabulate(16)(i => payload(p + 1 + i) & 0xff)
            val n = counts.sum
            if (n > 256 || p + 17 + n > body + bodyLen) return None
            val syms = new Array[Byte](n)
            System.arraycopy(payload, p + 17, syms, 0, n)
            val table = new DecodeTable(counts, syms)
            if (tc == 0) dcTabs(th) = table else acTabs(th) = table
            p += 17 + n
          }
        case 0xc0 | 0xc2 => // SOF0 baseline / SOF2 progressive
          if (w >= 0) return None // two frames
          progressive = marker == 0xc2
          if (bodyLen < 6 || (payload(body) & 0xff) != 8) return None
          h = u16(body + 1); w = u16(body + 3)
          nComp = payload(body + 5) & 0xff
          if (w <= 0 || h <= 0 || (nComp != 1 && nComp != 3)) return None
          if (bodyLen < 6 + 3 * nComp) return None
          var c = 0
          while (c < nComp) {
            compId(c) = payload(body + 6 + 3 * c) & 0xff
            val samp = payload(body + 7 + 3 * c) & 0xff
            compH(c) = (samp >> 4) & 0x0f
            compV(c) = samp & 0x0f
            // sampling factors 1 or 2 cover gray, 4:4:4, 4:2:2 and
            // 4:2:0 — the baseline layouts the web actually uses;
            // 4× factors quarantine
            if (compH(c) < 1 || compH(c) > 2 || compV(c) < 1 || compV(c) > 2)
              return None
            compQ(c) = payload(body + 8 + 3 * c) & 0xff
            if (compQ(c) > 3) return None
            c += 1
          }
          if ((nComp.toLong * w * h) > maxBytes) return None // geometry cap
        case 0xc1 | 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xc9 | 0xca | 0xcb |
            0xcd | 0xce | 0xcf => return None // unsupported frame types
        case 0xdd => // DRI
          if (bodyLen < 2) return None
          restartInterval = u16(body)
        case 0xda => // SOS
          if (w < 0) return None
          if (progressive) {
            // progressive scans parse their own headers — hand the walk
            // off at the first SOS marker
            return decodeProgressive(payload, pos, w, h, nComp,
              compId, compH, compV, compQ, quant, dcTabs, acTabs,
              restartInterval)
          }
          if (bodyLen < 1 + 2 * nComp + 3) return None
          val ns = payload(body) & 0xff
          if (ns != nComp) return None // interleaved single scan only
          var c = 0
          while (c < ns) {
            val cid = payload(body + 1 + 2 * c) & 0xff
            val idx = compId.indexOf(cid)
            if (idx < 0) return None
            compDc(idx) = (payload(body + 2 + 2 * c) >> 4) & 0x0f
            compAc(idx) = payload(body + 2 + 2 * c) & 0x0f
            c += 1
          }
          sosAt = pos + 2 + len
        case _ => () // APPn, COM, others: skip
      }
      pos += 2 + len
    }
    // every referenced table must exist
    var c = 0
    while (c < nComp) {
      if (quant(compQ(c)) == null || dcTabs(compDc(c)) == null || acTabs(compAc(c)) == null)
        return None
      c += 1
    }
    // ---- entropy-coded scan: interleaved MCUs, sampling-factor-aware
    // (an MCU carries h_c × v_c blocks per component; 4:2:0's MCU is
    // 16×16 with 4 luma + 1 Cb + 1 Cr)
    var hmax = 1; var vmax = 1
    c = 0
    while (c < nComp) {
      if (compH(c) > hmax) hmax = compH(c)
      if (compV(c) > vmax) vmax = compV(c)
      c += 1
    }
    val mcusX = (w + 8 * hmax - 1) / (8 * hmax)
    val mcusY = (h + 8 * vmax - 1) / (8 * vmax)
    val planeW = Array.tabulate(nComp)(c => mcusX * compH(c) * 8)
    val planeH = Array.tabulate(nComp)(c => mcusY * compV(c) * 8)
    val planes = Array.tabulate(nComp)(c => new Array[Byte](planeW(c) * planeH(c)))
    val br = new BitReader(payload, sosAt)
    val preds = new Array[Int](3)
    val coef = new Array[Int](64)
    var mcu = 0
    val nMcu = mcusX * mcusY
    while (mcu < nMcu) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        br.align()
        val m = br.markerAhead
        if (m < 0xd0 || m > 0xd7) return None
        br.pos += 2
        java.util.Arrays.fill(preds, 0)
      }
      val mcuY = mcu / mcusX
      val mcuX = mcu % mcusX
      c = 0
      while (c < nComp) {
        var vi = 0
        while (vi < compV(c)) {
          var hi = 0
          while (hi < compH(c)) {
            java.util.Arrays.fill(coef, 0)
            val t = decodeSymbol(br, dcTabs(compDc(c)))
            if (t > 11) return None
            preds(c) += extend(br.bits(t), t)
            coef(0) = preds(c) * quant(compQ(c))(0)
            var k = 1
            while (k < 64) {
              val rs = decodeSymbol(br, acTabs(compAc(c)))
              if (br.badStream) return None
              val run = rs >> 4
              val size = rs & 0x0f
              if (size == 0) {
                if (run == 15) k += 16 // ZRL
                else k = 64 // EOB
              } else {
                k += run
                if (k > 63) return None
                coef(Zigzag(k)) = extend(br.bits(size), size) * quant(compQ(c))(Zigzag(k))
                k += 1
              }
            }
            if (br.badStream) return None
            val sp = idct(coef)
            val plane = planes(c)
            val rowW = planeW(c)
            val bx = mcuX * compH(c) + hi
            val by = mcuY * compV(c) + vi
            var y = 0
            while (y < 8) {
              var x = 0
              while (x < 8) {
                val v = Math.round(sp(y * 8 + x) + 128.0).toInt
                plane((by * 8 + y) * rowW + bx * 8 + x) =
                  (if (v < 0) 0 else if (v > 255) 255 else v).toByte
                x += 1
              }
              y += 1
            }
            hi += 1
          }
          vi += 1
        }
        c += 1
      }
      mcu += 1
    }
    planesToPixels(planes, planeW, compH, compV, hmax, vmax, nComp, w, h)
  }

  /** The shared decode tail: crop MCU padding, upsample subsampled
    * planes (pixel replication — nearest), color-convert. Behind both
    * the baseline and progressive paths — the frame types differ only
    * in how coefficients arrive, never in reconstruction.
    */
  private def planesToPixels(
      planes: Array[Array[Byte]], planeW: Array[Int],
      compH: Array[Int], compV: Array[Int], hmax: Int, vmax: Int,
      nComp: Int, w: Int, h: Int): Option[(Int, Int, Int, Array[Byte])] = {
    @inline def sample(c: Int, x: Int, y: Int): Int =
      planes(c)((y * compV(c) / vmax) * planeW(c) + (x * compH(c) / hmax)) & 0xff
    if (nComp == 1) {
      val out = new Array[Byte](w * h)
      var y = 0
      while (y < h) {
        System.arraycopy(planes(0), y * planeW(0), out, y * w, w)
        y += 1
      }
      Some((w, h, 1, out))
    } else {
      val out = new Array[Byte](3 * w * h)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val yy = sample(0, x, y)
          val cbv = sample(1, x, y) - 128
          val crv = sample(2, x, y) - 128
          val r = Math.round(yy + 1.402 * crv).toInt
          val g = Math.round(yy - 0.344136 * cbv - 0.714136 * crv).toInt
          val b = Math.round(yy + 1.772 * cbv).toInt
          val o = 3 * (y * w + x)
          out(o) = (if (r < 0) 0 else if (r > 255) 255 else r).toByte
          out(o + 1) = (if (g < 0) 0 else if (g > 255) 255 else g).toByte
          out(o + 2) = (if (b < 0) 0 else if (b > 255) 255 else b).toByte
          x += 1
        }
        y += 1
      }
      Some((w, h, 3, out))
    }
  }

  // --------------------------------------------------- progressive decode --

  /** Decode the scan sequence of a progressive (SOF2) frame. The marker
    * walk hands off here at the first SOS; scans accumulate QUANTIZED
    * coefficients per T.81 Annex G (spectral-selection bands,
    * successive-approximation first and refinement passes for DC and
    * AC, EOB runs spanning blocks), DHT/DQT/DRI are legal between
    * scans, and after EOI every block dequantizes and IDCTs through the
    * same reconstruction tail as baseline. Any malformation — bad scan
    * header, missing table, truncated entropy stream, band overrun —
    * quarantines (None).
    */
  private def decodeProgressive(
      payload: Array[Byte], sosPos: Int,
      w: Int, h: Int, nComp: Int,
      compId: Array[Int], compH: Array[Int], compV: Array[Int], compQ: Array[Int],
      quant: Array[Array[Int]], dcTabs: Array[DecodeTable], acTabs: Array[DecodeTable],
      restartInterval0: Int): Option[(Int, Int, Int, Array[Byte])] = {
    def u16(p: Int): Int = ((payload(p) & 0xff) << 8) | (payload(p + 1) & 0xff)
    var restartInterval = restartInterval0
    var hmax = 1; var vmax = 1
    var c = 0
    while (c < nComp) {
      if (compH(c) > hmax) hmax = compH(c)
      if (compV(c) > vmax) vmax = compV(c)
      c += 1
    }
    val mcusX = (w + 8 * hmax - 1) / (8 * hmax)
    val mcusY = (h + 8 * vmax - 1) / (8 * vmax)
    val blocksW = Array.tabulate(nComp)(c => mcusX * compH(c))
    val blocksH = Array.tabulate(nComp)(c => mcusY * compV(c))
    // non-interleaved scans traverse the component's OWN block grid
    // (T.81 A.2.2), not the MCU-padded one — storage stays padded, the
    // walk uses the row stride
    val usedW = Array.tabulate(nComp)(c => ((w * compH(c) + hmax - 1) / hmax + 7) / 8)
    val usedH = Array.tabulate(nComp)(c => ((h * compV(c) + vmax - 1) / vmax + 7) / 8)
    val coefs = Array.tabulate(nComp)(c => new Array[Int](blocksW(c) * blocksH(c) * 64))
    var pos = sosPos
    var sawEoi = false
    var sawScan = false
    while (!sawEoi) {
      if (pos + 2 > payload.length) return None
      if ((payload(pos) & 0xff) != 0xff) return None
      val marker = payload(pos + 1) & 0xff
      if (marker == 0xd9) sawEoi = true
      else if (marker == 0xff) pos += 1 // fill byte
      else if (marker == 0xd8 || (marker >= 0xd0 && marker <= 0xd7)) return None
      else if (marker == 0xc0 || marker == 0xc2 || marker == 0xc1 || marker == 0xc3 ||
        (marker >= 0xc5 && marker <= 0xc7) || (marker >= 0xc9 && marker <= 0xcb) ||
        (marker >= 0xcd && marker <= 0xcf)) return None // second frame
      else {
        if (pos + 4 > payload.length) return None
        val len = u16(pos + 2)
        if (len < 2 || pos + 2 + len > payload.length) return None
        val body = pos + 4
        val bodyLen = len - 2
        marker match {
          case 0xda =>
            if (bodyLen < 1) return None
            val ns = payload(body) & 0xff
            if (ns < 1 || ns > nComp || bodyLen != 1 + 2 * ns + 3) return None
            val scanComps = new Array[Int](ns)
            val scanDc = new Array[Int](ns)
            val scanAc = new Array[Int](ns)
            var i = 0
            while (i < ns) {
              val cid = payload(body + 1 + 2 * i) & 0xff
              val idx = compId.indexOf(cid)
              if (idx < 0) return None
              scanComps(i) = idx
              scanDc(i) = (payload(body + 2 + 2 * i) >> 4) & 0x0f
              scanAc(i) = payload(body + 2 + 2 * i) & 0x0f
              if (scanDc(i) > 3 || scanAc(i) > 3) return None
              i += 1
            }
            val ss = payload(body + 1 + 2 * ns) & 0xff
            val se = payload(body + 2 + 2 * ns) & 0xff
            val ahAl = payload(body + 3 + 2 * ns) & 0xff
            val ah = (ahAl >> 4) & 0x0f
            val al = ahAl & 0x0f
            if (ss == 0) { if (se != 0) return None } // DC scan
            else if (ns != 1 || ss > se || se > 63) return None // AC: one comp
            if (ah > 13 || al > 13) return None
            // table existence for what THIS scan reads
            if (ss == 0 && ah == 0) {
              i = 0
              while (i < ns) { if (dcTabs(scanDc(i)) == null) return None; i += 1 }
            }
            if (ss > 0 && acTabs(scanAc(0)) == null) return None
            decodeProgressiveScan(payload, pos + 2 + len, scanComps, scanDc,
              scanAc, ss, se, ah, al, coefs, blocksW, usedW, usedH,
              compH, compV, mcusX, mcusY, dcTabs, acTabs, restartInterval) match {
              case Some(next) => pos = next; sawScan = true
              case None => return None
            }
          case 0xc4 => // DHT between scans
            var pp = body
            while (pp < body + bodyLen) {
              if (pp + 17 > body + bodyLen) return None
              val tc = (payload(pp) >> 4) & 0x0f
              val th = payload(pp) & 0x0f
              if (tc > 1 || th > 3) return None
              val counts = Array.tabulate(16)(i => payload(pp + 1 + i) & 0xff)
              val n = counts.sum
              if (n > 256 || pp + 17 + n > body + bodyLen) return None
              val syms = new Array[Byte](n)
              System.arraycopy(payload, pp + 17, syms, 0, n)
              val table = new DecodeTable(counts, syms)
              if (tc == 0) dcTabs(th) = table else acTabs(th) = table
              pp += 17 + n
            }
            pos += 2 + len
          case 0xdb => // DQT between scans
            var pp = body
            while (pp < body + bodyLen) {
              val pq = (payload(pp) >> 4) & 0x0f
              val tq = payload(pp) & 0x0f
              if (pq != 0 || tq > 3 || pp + 65 > body + bodyLen) return None
              val t = new Array[Int](64)
              var k = 0
              while (k < 64) { t(Zigzag(k)) = payload(pp + 1 + k) & 0xff; k += 1 }
              // Quant tables latch at the frame's first scan (libjpeg
              // semantics): this loop starts AT the first SOS, so a DQT
              // seen here that CHANGES a table one of the frame's
              // components references cannot be honored — dequantizing
              // with the late table would decode different pixels than
              // the reference decoder. Decode-or-quarantine: drop the
              // file. Identical redefinitions and tables no component
              // uses are harmless and pass through.
              if (compQ.take(nComp).contains(tq) &&
                (quant(tq) == null || !java.util.Arrays.equals(quant(tq), t)))
                return None
              quant(tq) = t
              pp += 65
            }
            pos += 2 + len
          case 0xdd => // DRI between scans
            if (bodyLen < 2) return None
            restartInterval = u16(body)
            pos += 2 + len
          case _ => pos += 2 + len // APPn, COM: skip
        }
      }
    }
    if (!sawScan) return None
    // ---- dequantize + IDCT every block into the component planes
    val planeW = blocksW.map(_ * 8)
    val planes = Array.tabulate(nComp)(c => new Array[Byte](blocksW(c) * blocksH(c) * 64))
    val deq = new Array[Int](64)
    c = 0
    while (c < nComp) {
      val q = quant(compQ(c))
      if (q == null) return None
      val arr = coefs(c)
      var by = 0
      while (by < blocksH(c)) {
        var bx = 0
        while (bx < blocksW(c)) {
          val base = (by * blocksW(c) + bx) * 64
          var k = 0
          while (k < 64) { deq(k) = arr(base + k) * q(k); k += 1 }
          val sp = idct(deq)
          val plane = planes(c)
          val rowW = planeW(c)
          var y = 0
          while (y < 8) {
            var x = 0
            while (x < 8) {
              val v = Math.round(sp(y * 8 + x) + 128.0).toInt
              plane((by * 8 + y) * rowW + bx * 8 + x) =
                (if (v < 0) 0 else if (v > 255) 255 else v).toByte
              x += 1
            }
            y += 1
          }
          bx += 1
        }
        by += 1
      }
      c += 1
    }
    planesToPixels(planes, planeW, compH, compV, hmax, vmax, nComp, w, h)
  }

  /** One progressive scan's entropy segment: returns the position of
    * the marker that follows it, or None on corruption. The four scan
    * kinds (DC/AC × first/refinement) share the two traversal orders —
    * the MCU walk for interleaved DC scans, the component's own raster
    * for single-component scans — with restart markers resetting
    * predictors and the EOB run.
    */
  private def decodeProgressiveScan(
      payload: Array[Byte], dataStart: Int,
      scanComps: Array[Int], scanDc: Array[Int], scanAc: Array[Int],
      ss: Int, se: Int, ah: Int, al: Int,
      coefs: Array[Array[Int]],
      blocksW: Array[Int], usedW: Array[Int], usedH: Array[Int],
      compH: Array[Int], compV: Array[Int],
      mcusX: Int, mcusY: Int,
      dcTabs: Array[DecodeTable], acTabs: Array[DecodeTable],
      restartInterval: Int): Option[Int] = {
    val br = new BitReader(payload, dataStart)
    val ns = scanComps.length
    val preds = new Array[Int](ns)
    var eobrun = 0
    var bad = false
    def restartCheck(unit: Int): Unit =
      if (restartInterval > 0 && unit > 0 && unit % restartInterval == 0) {
        br.align()
        val m = br.markerAhead
        if (m < 0xd0 || m > 0xd7) bad = true
        else {
          br.pos += 2
          java.util.Arrays.fill(preds, 0)
          eobrun = 0
        }
      }
    // ---- the per-block unit for this scan kind: (scanIdx, coefBase)
    val unit: (Int, Int) => Unit =
      if (ss == 0 && ah == 0) { (si, base) => // DC first
        val t = decodeSymbol(br, dcTabs(scanDc(si)))
        if (t > 11 || br.badStream) bad = true
        else {
          preds(si) += extend(br.bits(t), t)
          coefs(scanComps(si))(base) = preds(si) << al
        }
      }
      else if (ss == 0) { (si, base) => // DC refinement: one bit per block
        if (br.bit() == 1) coefs(scanComps(si))(base) |= (1 << al)
      }
      else if (ah == 0) { (si, base) => // AC first (G.2.2)
        val arr = coefs(scanComps(si))
        if (eobrun > 0) eobrun -= 1
        else {
          var k = ss
          var done = false
          while (!done && !bad && k <= se) {
            val rs = decodeSymbol(br, acTabs(scanAc(si)))
            if (br.badStream) bad = true
            else {
              val r = rs >> 4
              val sz = rs & 15
              if (sz == 0) {
                if (r == 15) k += 16 // ZRL
                else {
                  eobrun = (1 << r) - 1 + (if (r > 0) br.bits(r) else 0)
                  done = true
                }
              } else {
                k += r
                if (k > se) bad = true
                else {
                  arr(base + Zigzag(k)) = extend(br.bits(sz), sz) << al
                  k += 1
                }
              }
            }
          }
        }
      }
      else { (si, base) => // AC refinement (G.1.2.3)
        val arr = coefs(scanComps(si))
        val p1 = 1 << al
        val m1 = -1 << al
        def correct(idx: Int): Unit =
          if (br.bit() == 1 && (arr(idx) & p1) == 0)
            arr(idx) += (if (arr(idx) >= 0) p1 else m1)
        var k = ss
        if (eobrun == 0) {
          var done = false
          while (!done && !bad && k <= se) {
            val rs = decodeSymbol(br, acTabs(scanAc(si)))
            if (br.badStream) bad = true
            else {
              var r = rs >> 4
              val sz = rs & 15
              var newval = 0
              if (sz == 0) {
                if (r < 15) { // EOB run INCLUDING this block
                  eobrun = (1 << r) + (if (r > 0) br.bits(r) else 0)
                  done = true
                } // r == 15: ZRL, skip 16 zero-history coefficients
              } else if (sz != 1) bad = true // refinement codes only size 1
              else newval = if (br.bit() == 1) p1 else m1
              if (!bad && !done) {
                // advance r zero-history positions, correcting the
                // nonzero-history coefficients passed over
                var placed = false
                while (!placed && k <= se) {
                  val idx = base + Zigzag(k)
                  if (arr(idx) != 0) correct(idx)
                  else if (r == 0) {
                    if (sz != 0) arr(idx) = newval
                    placed = true
                  } else r -= 1
                  k += 1
                }
                if (!placed && sz != 0) bad = true // run past the band end
              }
            }
          }
        }
        if (!bad && eobrun > 0) {
          // EOB: correction bits for the band's remaining nonzero coefs
          while (k <= se) {
            val idx = base + Zigzag(k)
            if (arr(idx) != 0) correct(idx)
            k += 1
          }
          eobrun -= 1
        }
      }
    // ---- traversal: interleaved MCU walk, or the component's own grid
    if (ns > 1) {
      val nMcu = mcusX * mcusY
      var mcu = 0
      while (!bad && mcu < nMcu) {
        restartCheck(mcu)
        var si = 0
        while (!bad && si < ns) {
          val c = scanComps(si)
          var vi = 0
          while (!bad && vi < compV(c)) {
            var hi = 0
            while (!bad && hi < compH(c)) {
              val bx = (mcu % mcusX) * compH(c) + hi
              val by = (mcu / mcusX) * compV(c) + vi
              unit(si, (by * blocksW(c) + bx) * 64)
              hi += 1
            }
            vi += 1
          }
          si += 1
        }
        mcu += 1
      }
    } else {
      val c = scanComps(0)
      val n = usedW(c) * usedH(c)
      var i = 0
      while (!bad && i < n) {
        restartCheck(i)
        unit(0, ((i / usedW(c)) * blocksW(c) + (i % usedW(c))) * 64)
        i += 1
      }
    }
    if (bad || br.badStream) None else Some(br.pos)
  }

  // -------------------------------------------------- progressive encoder --

  /** The AC Huffman table the progressive EMITTERS write into their
    * DHT segments: the Annex K tables lack the EOBn symbols (0x10-0xE0)
    * progressive EOB runs longer than one block require, so the
    * emitters carry their own — every EOBn, ZRL, and run/size symbol at
    * a flat 8-bit length (176 codes; the all-ones code stays reserved
    * per C.2). Deliberately non-optimal: these are fixture/test
    * streams, and the decoder reads whatever DHT the file declares.
    */
  private val ProgAcSyms: Array[Byte] = (
    (0 to 14).map(r => (r << 4).toByte) ++ // EOBn
      Seq(0xf0.toByte) ++ // ZRL
      (for (r <- 0 to 15; sz <- 1 to 10) yield ((r << 4) | sz).toByte)
    ).toArray
  private val ProgAcCounts: Array[Int] =
    Array(0, 0, 0, 0, 0, 0, 0, ProgAcSyms.length, 0, 0, 0, 0, 0, 0, 0, 0)

  /** Quantized coefficient blocks of one channel (natural order), raster
    * over the block grid — the shared front half of the progressive
    * fixture emitters.
    */
  private def quantBlocks(
      w: Int, h: Int, quant: Array[Int],
      get: (Int, Int) => Int): Array[Array[Int]] = {
    val bxN = (w + 7) / 8
    val byN = (h + 7) / 8
    Array.tabulate(byN * bxN) { i =>
      val f = fdct(block(i % bxN, i / bxN, w, h, get))
      Array.tabulate(64)(k => Math.round(f(k) / quant(k)).toInt)
    }
  }

  /** DC scan of a progressive frame: first pass (`ah = 0`) emits the
    * point-transformed DC diffs, refinement emits one bit per block —
    * components interleaved in MCU order (for the 1×1-sampling layouts
    * the fixture emitters write, MCU order IS block raster order).
    */
  private def emitDcScan(
      bw: BitWriter, comps: Seq[(Array[Array[Int]], Array[(Int, Int)])],
      ah: Int, al: Int): Unit = {
    val preds = new Array[Int](comps.size)
    val n = comps.head._1.length
    var i = 0
    while (i < n) {
      var ci = 0
      while (ci < comps.size) {
        val coef = comps(ci)._1(i)(0)
        if (ah == 0) {
          val v = coef >> al
          val diff = v - preds(ci)
          preds(ci) = v
          val t = category(diff)
          val (code, len) = comps(ci)._2(t)
          bw.put(code, len)
          if (t > 0) bw.put(if (diff >= 0) diff else diff + (1 << t) - 1, t)
        } else bw.put((coef >> al) & 1, 1)
        ci += 1
      }
      i += 1
    }
  }

  /** AC first scan (`ah = 0`) of one component: run/size symbols over
    * the point-transformed band with EOB runs accumulated ACROSS blocks
    * (T.81 G.1.2.2 — all-zero tails fold into one EOBn symbol).
    */
  private def emitAcFirstScan(
      bw: BitWriter, blocks: Array[Array[Int]], acTab: Array[(Int, Int)],
      ss: Int, se: Int, al: Int): Unit = {
    var eobrun = 0
    def flushEob(): Unit = if (eobrun > 0) {
      var t = eobrun
      var nbits = 0
      while ({ t >>= 1; t != 0 }) nbits += 1
      val (c, l) = acTab(nbits << 4)
      bw.put(c, l)
      if (nbits > 0) bw.put(eobrun & ((1 << nbits) - 1), nbits)
      eobrun = 0
    }
    blocks.foreach { b =>
      var r = 0
      var k = ss
      while (k <= se) {
        val raw = b(Zigzag(k))
        val tmp = if (raw < 0) -((-raw) >> al) else raw >> al
        if (tmp == 0) r += 1
        else {
          flushEob()
          while (r > 15) { val (z, zl) = acTab(0xf0); bw.put(z, zl); r -= 16 }
          val sz = category(tmp)
          val (c, l) = acTab((r << 4) | sz)
          bw.put(c, l)
          bw.put(if (tmp >= 0) tmp else tmp + (1 << sz) - 1, sz)
          r = 0
        }
        k += 1
      }
      if (r > 0) { eobrun += 1; if (eobrun == 0x7fff) flushEob() }
    }
    flushEob()
  }

  /** AC refinement scan of one component: newly-significant
    * coefficients as run/1 symbols, correction bits for the
    * previously-nonzero ones buffered and attached to the symbol (or
    * EOB run) they follow — the T.81 G.1.2.3 bit discipline the decoder
    * replays.
    */
  private def emitAcRefineScan(
      bw: BitWriter, blocks: Array[Array[Int]], acTab: Array[(Int, Int)],
      ss: Int, se: Int, al: Int): Unit = {
    var eobrun = 0
    val pending = scala.collection.mutable.ArrayBuffer.empty[Int]
    def flushEob(): Unit = {
      if (eobrun > 0) {
        var t = eobrun
        var nbits = 0
        while ({ t >>= 1; t != 0 }) nbits += 1
        val (c, l) = acTab(nbits << 4)
        bw.put(c, l)
        if (nbits > 0) bw.put(eobrun & ((1 << nbits) - 1), nbits)
        eobrun = 0
      }
      pending.foreach(bit => bw.put(bit, 1))
      pending.clear()
    }
    blocks.foreach { b =>
      val absv = Array.tabulate(se + 1) { k =>
        if (k < ss) 0
        else { val v = b(Zigzag(k)); (if (v < 0) -v else v) >> al }
      }
      var eob = 0
      var k = ss
      while (k <= se) { if (absv(k) == 1) eob = k; k += 1 }
      var r = 0
      val local = scala.collection.mutable.ArrayBuffer.empty[Int]
      k = ss
      while (k <= se) {
        val tmp = absv(k)
        if (tmp == 0) r += 1
        else {
          while (r > 15 && k <= eob) { // ZRLs not foldable into the EOB run
            flushEob()
            val (z, zl) = acTab(0xf0)
            bw.put(z, zl)
            r -= 16
            local.foreach(bit => bw.put(bit, 1))
            local.clear()
          }
          if (tmp > 1) local += (tmp & 1) // previously nonzero: correction bit
          else { // newly significant
            flushEob()
            val (c, l) = acTab((r << 4) | 1)
            bw.put(c, l)
            bw.put(if (b(Zigzag(k)) < 0) 0 else 1, 1)
            local.foreach(bit => bw.put(bit, 1))
            local.clear()
            r = 0
          }
        }
        k += 1
      }
      if (r > 0 || local.nonEmpty) {
        eobrun += 1
        pending ++= local
        if (eobrun == 0x7fff || pending.size > 937) flushEob() // the T.81 bounds
      }
    }
    flushEob()
  }

  /** Progressive (SOF2) GRAYSCALE JPEG — the decode side's fixture/test
    * twin, NOT a production encoder (production writes stay baseline).
    * Scan script: DC first at Al=1, the whole AC band first at Al=1,
    * then DC and AC refinement to Al=0 — spectral selection AND
    * successive approximation on both coefficient classes, so a decoder
    * has to get all four Annex G procedures right to reproduce the
    * pixels.
    */
  def encodeGrayProgressive(width: Int, height: Int, pixels: Array[Byte]): Array[Byte] = {
    require(width > 0 && height > 0, "jpeg dimensions must be positive")
    require(width <= 65535 && height <= 65535, "jpeg dimensions exceed 16 bits")
    def px(x: Int, y: Int): Int =
      if (pixels.isEmpty) 0 else pixels((y * width + x) % pixels.length) & 0xff
    val blocks = quantBlocks(width, height, QuantLuma, px)
    val dcT = buildEncodeTable(DcLumaCounts, DcLumaSyms)
    val acT = buildEncodeTable(ProgAcCounts, ProgAcSyms)
    val out = new java.io.ByteArrayOutputStream()
    out.write(0xff); out.write(0xd8)
    seg(out, 0xe0, Jfif)
    seg(out, 0xdb, dqtBody(0, QuantLuma))
    seg(out, 0xc2, Array[Byte](8,
      ((height >> 8) & 0xff).toByte, (height & 0xff).toByte,
      ((width >> 8) & 0xff).toByte, (width & 0xff).toByte,
      1, 1, 0x11, 0))
    seg(out, 0xc4, dhtBody(0, 0, DcLumaCounts, DcLumaSyms))
    seg(out, 0xc4, dhtBody(1, 0, ProgAcCounts, ProgAcSyms))
    def sos(comps: Seq[(Int, Int)], ss: Int, se: Int, ah: Int, al: Int)(
        emit: BitWriter => Unit): Unit = {
      seg(out, 0xda,
        Array[Byte](comps.size.toByte) ++
          comps.flatMap { case (cid, tabs) => Seq(cid.toByte, tabs.toByte) } ++
          Array[Byte](ss.toByte, se.toByte, (((ah << 4) | al) & 0xff).toByte))
      val bw = new BitWriter(out)
      emit(bw)
      bw.flush()
    }
    sos(Seq((1, 0x00)), 0, 0, 0, 1)(bw => emitDcScan(bw, Seq((blocks, dcT)), 0, 1))
    sos(Seq((1, 0x00)), 1, 63, 0, 1)(bw => emitAcFirstScan(bw, blocks, acT, 1, 63, 1))
    sos(Seq((1, 0x00)), 0, 0, 1, 0)(bw => emitDcScan(bw, Seq((blocks, dcT)), 1, 0))
    sos(Seq((1, 0x00)), 1, 63, 1, 0)(bw => emitAcRefineScan(bw, blocks, acT, 1, 63, 0))
    out.write(0xff); out.write(0xd9)
    out.toByteArray
  }

  /** Progressive 4:4:4 COLOR JPEG fixture emitter — [[encodeGrayProgressive]]'s
    * three-component sibling: one interleaved DC scan per pass, AC
    * scans one component at a time (progressive AC scans are
    * non-interleaved by spec), same Al=1→0 script.
    */
  def encodeColor444Progressive(width: Int, height: Int, rgb: Array[Byte]): Array[Byte] = {
    require(width > 0 && height > 0, "jpeg dimensions must be positive")
    require(width <= 65535 && height <= 65535, "jpeg dimensions exceed 16 bits")
    def ch(x: Int, y: Int, c: Int): Int =
      if (rgb.isEmpty) 0 else rgb((3 * (y * width + x) + c) % rgb.length) & 0xff
    def yb(x: Int, y: Int): Int = {
      val r = ch(x, y, 0); val g = ch(x, y, 1); val b = ch(x, y, 2)
      Math.round(0.299 * r + 0.587 * g + 0.114 * b).toInt
    }
    def cb(x: Int, y: Int): Int = {
      val r = ch(x, y, 0); val g = ch(x, y, 1); val b = ch(x, y, 2)
      Math.round(128 - 0.168736 * r - 0.331264 * g + 0.5 * b).toInt
    }
    def cr(x: Int, y: Int): Int = {
      val r = ch(x, y, 0); val g = ch(x, y, 1); val b = ch(x, y, 2)
      Math.round(128 + 0.5 * r - 0.418688 * g - 0.081312 * b).toInt
    }
    val bY = quantBlocks(width, height, QuantLuma, yb)
    val bCb = quantBlocks(width, height, QuantChroma, cb)
    val bCr = quantBlocks(width, height, QuantChroma, cr)
    val dcL = buildEncodeTable(DcLumaCounts, DcLumaSyms)
    val dcC = buildEncodeTable(DcChromaCounts, DcChromaSyms)
    val acP = buildEncodeTable(ProgAcCounts, ProgAcSyms)
    val out = new java.io.ByteArrayOutputStream()
    out.write(0xff); out.write(0xd8)
    seg(out, 0xe0, Jfif)
    seg(out, 0xdb, dqtBody(0, QuantLuma))
    seg(out, 0xdb, dqtBody(1, QuantChroma))
    seg(out, 0xc2, Array[Byte](8,
      ((height >> 8) & 0xff).toByte, (height & 0xff).toByte,
      ((width >> 8) & 0xff).toByte, (width & 0xff).toByte,
      3, 1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1))
    seg(out, 0xc4, dhtBody(0, 0, DcLumaCounts, DcLumaSyms))
    seg(out, 0xc4, dhtBody(0, 1, DcChromaCounts, DcChromaSyms))
    seg(out, 0xc4, dhtBody(1, 0, ProgAcCounts, ProgAcSyms))
    def sos(comps: Seq[(Int, Int)], ss: Int, se: Int, ah: Int, al: Int)(
        emit: BitWriter => Unit): Unit = {
      seg(out, 0xda,
        Array[Byte](comps.size.toByte) ++
          comps.flatMap { case (cid, tabs) => Seq(cid.toByte, tabs.toByte) } ++
          Array[Byte](ss.toByte, se.toByte, (((ah << 4) | al) & 0xff).toByte))
      val bw = new BitWriter(out)
      emit(bw)
      bw.flush()
    }
    sos(Seq((1, 0x00), (2, 0x10), (3, 0x10)), 0, 0, 0, 1)(bw =>
      emitDcScan(bw, Seq((bY, dcL), (bCb, dcC), (bCr, dcC)), 0, 1))
    sos(Seq((1, 0x00)), 1, 63, 0, 1)(bw => emitAcFirstScan(bw, bY, acP, 1, 63, 1))
    sos(Seq((2, 0x10)), 1, 63, 0, 1)(bw => emitAcFirstScan(bw, bCb, acP, 1, 63, 1))
    sos(Seq((3, 0x10)), 1, 63, 0, 1)(bw => emitAcFirstScan(bw, bCr, acP, 1, 63, 1))
    sos(Seq((1, 0x00), (2, 0x10), (3, 0x10)), 0, 0, 1, 0)(bw =>
      emitDcScan(bw, Seq((bY, dcL), (bCb, dcC), (bCr, dcC)), 1, 0))
    sos(Seq((1, 0x00)), 1, 63, 1, 0)(bw => emitAcRefineScan(bw, bY, acP, 1, 63, 0))
    sos(Seq((2, 0x10)), 1, 63, 1, 0)(bw => emitAcRefineScan(bw, bCb, acP, 1, 63, 0))
    sos(Seq((3, 0x10)), 1, 63, 1, 0)(bw => emitAcRefineScan(bw, bCr, acP, 1, 63, 0))
    out.write(0xff); out.write(0xd9)
    out.toByteArray
  }
}
