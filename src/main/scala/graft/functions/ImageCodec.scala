package graft.functions

/** Deterministic toy image codec for the image+caption payload path.
  *
  * The container has no real image libraries, so per the build brief the
  * *decode step* is a deterministic fake — but everything Spark-side
  * (binary column, schema, expressions, PSNR verification, partition shape)
  * is real. Format:
  *
  *   bytes = magic(4) ++ w(2, big-endian) ++ h(2, big-endian) ++ gray pixels (w*h)
  *
  * magic "GR01" = lossless ("png"-like); "GR02" = lossy ("jpg"-like,
  * pixels quantized to step 4 -> worst-case error 2, PSNR ~= 47 dB, above
  * the >=40 dB gate from BASELINE.json).
  *
  * All functions are pure and total on valid payloads; used from Catalyst
  * expressions and UDFs.
  */
object ImageCodec {
  val MagicLossless = "GR01"
  val MagicLossy = "GR02"
  val HeaderLen = 8

  /** splitmix64 — deterministic per-pixel noise source. */
  def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def stringSeed(s: String): Long = {
    var h = 1125899906842597L
    var i = 0
    while (i < s.length) { h = 31 * h + s.charAt(i); i += 1 }
    h
  }

  /** Deterministic pixel content: a smooth gradient + seeded noise, so
    * brightness/contrast features are non-trivial. */
  def pixelAt(seed: Long, x: Int, y: Int, w: Int, h: Int): Int = {
    val grad = (x * 255 / math.max(1, w - 1) + y * 255 / math.max(1, h - 1)) / 2
    val noise = (mix64(seed ^ (y.toLong * w + x)) & 0x3f).toInt - 32
    math.max(0, math.min(255, grad + noise))
  }

  def encode(seed: Long, w: Int, h: Int, lossy: Boolean): Array[Byte] = {
    val out = new Array[Byte](HeaderLen + w * h)
    val magic = if (lossy) MagicLossy else MagicLossless
    var i = 0
    while (i < 4) { out(i) = magic.charAt(i).toByte; i += 1 }
    out(4) = ((w >> 8) & 0xff).toByte; out(5) = (w & 0xff).toByte
    out(6) = ((h >> 8) & 0xff).toByte; out(7) = (h & 0xff).toByte
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        var p = pixelAt(seed, x, y, w, h)
        if (lossy) p = math.min(255, (p & 0xfc) | 0x02) // quantize, step 4
        out(HeaderLen + y * w + x) = p.toByte
        x += 1
      }
      y += 1
    }
    out
  }

  // Truncated/corrupt payloads (< header length) decode to zero-size, not
  // exceptions: these run inside codegen'd SQL expressions on arbitrary
  // binary input — a crash here kills the task, defeating the error-channel
  // design. ErrorChannel.imageChecks still FLAGS such rows.
  def width(bytes: Array[Byte]): Int =
    if (bytes.length < HeaderLen) 0
    else ((bytes(4) & 0xff) << 8) | (bytes(5) & 0xff)
  def height(bytes: Array[Byte]): Int =
    if (bytes.length < HeaderLen) 0
    else ((bytes(6) & 0xff) << 8) | (bytes(7) & 0xff)
  def isLossy(bytes: Array[Byte]): Boolean =
    bytes.length >= 4 &&
      bytes(0) == 'G' && bytes(1) == 'R' && bytes(2) == '0' && bytes(3) == '2'

  /** Decode to int pixels [0,255]; short payloads yield an empty array. */
  def decode(bytes: Array[Byte]): Array[Int] = {
    val n = math.max(0, bytes.length - HeaderLen)
    val px = new Array[Int](n)
    var i = 0
    while (i < n) { px(i) = bytes(HeaderLen + i) & 0xff; i += 1 }
    px
  }

  /** PSNR in dB between two equally-sized payloads (infinity -> 99.0 cap so
    * the column stays a plain double). */
  def psnr(a: Array[Byte], b: Array[Byte]): Double = {
    val pa = decode(a); val pb = decode(b)
    require(pa.length == pb.length, "psnr: size mismatch")
    var se = 0.0
    var i = 0
    while (i < pa.length) { val d = (pa(i) - pb(i)).toDouble; se += d * d; i += 1 }
    val mse = se / pa.length
    if (mse == 0.0) 99.0 else 20.0 * math.log10(255.0 / math.sqrt(mse))
  }

  def meanBrightness(bytes: Array[Byte]): Double = {
    val n = bytes.length - HeaderLen
    if (n <= 0) return 0.0
    // allocation-free: this runs once per row in the flagship hot path and
    // per-row garbage is what throttles the 32-thread scaling run
    var s = 0.0
    var i = HeaderLen
    while (i < bytes.length) { s += (bytes(i) & 0xff); i += 1 }
    s / n
  }

  /** Nearest-neighbor resize to (nw, nh); returns a lossless payload.
    * Total on corrupt input (same contract as decode/aHash64): a source
    * whose header dims don't match its payload — including forged dims
    * whose product overflows Int — yields the requested-size payload with
    * zero pixels instead of an out-of-bounds crash. */
  def resize(bytes: Array[Byte], nw: Int, nh: Int): Array[Byte] = {
    val w = width(bytes); val h = height(bytes)
    val px = decode(bytes)
    val out = new Array[Byte](HeaderLen + nw * nh)
    var i = 0
    while (i < 4) { out(i) = MagicLossless.charAt(i).toByte; i += 1 }
    out(4) = ((nw >> 8) & 0xff).toByte; out(5) = (nw & 0xff).toByte
    out(6) = ((nh >> 8) & 0xff).toByte; out(7) = (nh & 0xff).toByte
    if (w <= 0 || h <= 0 || px.length < w.toLong * h) return out
    var y = 0
    while (y < nh) {
      val sy = math.min(h - 1, y * h / nh)
      var x = 0
      while (x < nw) {
        val sx = math.min(w - 1, x * w / nw)
        out(HeaderLen + y * nw + x) = px(sy * w + sx).toByte
        x += 1
      }
      y += 1
    }
    out
  }

  /** Population standard deviation of the pixel values, computed from
    * EXACT integer sum/sum-of-squares (both < 2^53, so the derived doubles
    * are identical in any engine that accumulates the same integers —
    * the property the image-quality oracle's threshold compares rely on).
    * Empty/corrupt payloads yield 0. */
  def pixelStd(bytes: Array[Byte]): Double = {
    val n = bytes.length - HeaderLen
    if (n <= 0) return 0.0
    var s = 0L
    var sq = 0L
    var i = HeaderLen
    while (i < bytes.length) {
      val p = bytes(i) & 0xff
      s += p; sq += p.toLong * p
      i += 1
    }
    val mean = s.toDouble / n
    math.sqrt(sq.toDouble / n - mean * mean)
  }

  /** Square crop of side `s` at source offset (x, y); pixels outside the
    * source bounds are zero-filled (so crops near edges stay total and
    * deterministic). Same totality contract as resize: a corrupt source
    * yields the requested-size zero payload, and a size outside the
    * allocatable range (1..46340) yields the empty payload. */
  def crop(bytes: Array[Byte], x: Int, y: Int, s: Int): Array[Byte] = {
    // totality on arbitrary input includes the SIZE argument: the crop_image
    // Catalyst expression exposes s to SQL, where s > 46340 overflows the
    // Int allocation size s*s (NegativeArraySizeException) before the 2-byte
    // header dims would even truncate at s > 0xffff. Out-of-range sizes
    // yield the canonical empty payload, same as a corrupt source.
    if (s <= 0 || s > 46340) return Array.empty[Byte]
    val w = width(bytes); val h = height(bytes)
    val px = decode(bytes)
    val out = new Array[Byte](HeaderLen + s * s)
    var i = 0
    while (i < 4) { out(i) = MagicLossless.charAt(i).toByte; i += 1 }
    out(4) = ((s >> 8) & 0xff).toByte; out(5) = (s & 0xff).toByte
    out(6) = ((s >> 8) & 0xff).toByte; out(7) = (s & 0xff).toByte
    if (w <= 0 || h <= 0 || px.length < w.toLong * h) return out
    var dy = 0
    while (dy < s) {
      val sy = y + dy
      var dx = 0
      while (dx < s) {
        val sx = x + dx
        if (sx >= 0 && sy >= 0 && sx < w && sy < h)
          out(HeaderLen + dy * s + dx) = px(sy * w + sx).toByte
        dx += 1
      }
      dy += 1
    }
    out
  }

  /** Average-hash (aHash) perceptual fingerprint: nearest-neighbor sample
    * to an 8x8 grid (the `resize` index arithmetic), then bit i is set iff
    * sample i is strictly above the grid mean. The comparison is kept in
    * exact integer space (px*64 > sum) so a DuckDB mirror replaying the
    * same stored bytes composes the identical 64-bit value. Short payloads
    * hash to 0 (total on corrupt input, like the other codec functions). */
  def aHash64(bytes: Array[Byte]): Long = {
    val w = width(bytes); val h = height(bytes)
    // w.toLong * h: a forged header can declare dims whose product
    // overflows Int (46341^2 wraps negative), which would slip past the
    // guard and crash the sampling loop — totality on arbitrary binary is
    // the contract here
    if (w <= 0 || h <= 0 || bytes.length < HeaderLen + w.toLong * h) return 0L
    val s = new Array[Int](64)
    var sum = 0
    var y = 0
    while (y < 8) {
      val sy = math.min(h - 1, y * h / 8)
      var x = 0
      while (x < 8) {
        val sx = math.min(w - 1, x * w / 8)
        val p = bytes(HeaderLen + sy * w + sx) & 0xff
        s(y * 8 + x) = p
        sum += p
        x += 1
      }
      y += 1
    }
    var hash = 0L
    var i = 0
    while (i < 64) {
      if (s(i) * 64 > sum) hash |= (1L << i)
      i += 1
    }
    hash
  }

  /** 16-bin intensity histogram (normalized shares). */
  def intensityHistogram(bytes: Array[Byte]): Array[Double] = {
    val px = decode(bytes)
    val bins = new Array[Double](16)
    var i = 0
    while (i < px.length) { bins(px(i) >> 4) += 1.0; i += 1 }
    if (px.nonEmpty) { var b = 0; while (b < 16) { bins(b) /= px.length; b += 1 } }
    bins
  }
}
