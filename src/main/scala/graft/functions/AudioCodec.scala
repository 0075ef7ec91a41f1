package graft.functions

/** Deterministic toy audio codec — the audio leg of the multimodal payload
  * path (build brief: image/audio/video as opaque binary columns with typed
  * metadata; the container has no audio libraries, so the DECODE step is a
  * deterministic fake while the Spark side — binary column, header schema,
  * codegen'd expressions, frame windowing — is real, same stance as
  * [[ImageCodec]]).
  *
  * Format: magic(4) ++ sr(2, big-endian) ++ n(2, big-endian) ++ n unsigned
  * 8-bit samples centered at 128.  Magic "GA01" = pcm ("wav"-like,
  * lossless); "GA02" = quantized ("mp3"-like lossy analog, step 4 →
  * worst-case error 2, PSNR ≈ 47 dB over the 8-bit range — above the
  * ≥40 dB payload-fidelity gate from BASELINE.json).
  *
  * Every feature below is integer arithmetic over the stored bytes (the
  * only doubles are final divisions/sqrt), so a DuckDB oracle can re-derive
  * each value from the SAME parquet blobs via hex slicing — the q74
  * image-fidelity pattern.
  */
object AudioCodec {
  val MagicPcm = "GA01"
  val MagicLossy = "GA02"
  val HeaderLen = 8

  /** Deterministic sample: integer triangle carrier (period 16..31 from the
    * seed) + seeded noise, centered at 128 — integer-only, clamped. */
  def sampleAt(seed: Long, i: Int): Int = {
    val period = 16 + (ImageCodec.mix64(seed ^ 0x5bd1L) & 15L).toInt
    val ph = i % period
    val half = period / 2
    val tri = if (ph < half) ph * 96 / half - 48 else 48 - (ph - half) * 96 / half
    val noise = (ImageCodec.mix64(seed ^ (i.toLong * 0x9e3779b9L)) & 0x1f).toInt - 16
    math.max(0, math.min(255, 128 + tri + noise))
  }

  def encode(seed: Long, sr: Int, n: Int, lossy: Boolean): Array[Byte] = {
    val out = new Array[Byte](HeaderLen + n)
    val magic = if (lossy) MagicLossy else MagicPcm
    var i = 0
    while (i < 4) { out(i) = magic.charAt(i).toByte; i += 1 }
    out(4) = ((sr >> 8) & 0xff).toByte; out(5) = (sr & 0xff).toByte
    out(6) = ((n >> 8) & 0xff).toByte; out(7) = (n & 0xff).toByte
    var j = 0
    while (j < n) {
      var v = sampleAt(seed, j)
      if (lossy) v = math.min(255, (v & 0xfc) | 0x02)
      out(HeaderLen + j) = v.toByte
      j += 1
    }
    out
  }

  // Header reads are total on any payload (short/corrupt → 0), matching the
  // ImageCodec stance: these run inside codegen'd expressions on arbitrary
  // binary input and must never throw.
  def sampleRate(bytes: Array[Byte]): Int =
    if (bytes.length < HeaderLen) 0
    else ((bytes(4) & 0xff) << 8) | (bytes(5) & 0xff)
  def numSamples(bytes: Array[Byte]): Int =
    if (bytes.length < HeaderLen) 0
    else ((bytes(6) & 0xff) << 8) | (bytes(7) & 0xff)
  def isLossy(bytes: Array[Byte]): Boolean =
    bytes.length >= 4 &&
      bytes(0) == 'G' && bytes(1) == 'A' && bytes(2) == '0' && bytes(3) == '2'

  /** Decode to int samples [0,255]; short payloads yield an empty array. */
  def decode(bytes: Array[Byte]): Array[Int] = {
    val n = math.max(0, bytes.length - HeaderLen)
    val s = new Array[Int](n)
    var i = 0
    while (i < n) { s(i) = bytes(HeaderLen + i) & 0xff; i += 1 }
    s
  }

  /** Mean |x − 128| over the samples (0.0 on empty) — the loudness analog.
    * Integer sum, one final double division. */
  def meanAmplitude(bytes: Array[Byte]): Double = {
    val n = bytes.length - HeaderLen
    if (n <= 0) return 0.0
    var s = 0L
    var i = HeaderLen
    while (i < bytes.length) {
      val d = (bytes(i) & 0xff) - 128
      s += math.abs(d)
      i += 1
    }
    s.toDouble / n
  }

  /** Sign flips of (x − 128) with sign(x) := x ≥ 128 — the zero-crossing
    * rate numerator, exactly re-derivable from the bytes. */
  def zeroCrossings(bytes: Array[Byte]): Int = {
    val n = bytes.length - HeaderLen
    if (n <= 1) return 0
    var c = 0
    var prev = (bytes(HeaderLen) & 0xff) >= 128
    var i = HeaderLen + 1
    while (i < bytes.length) {
      val cur = (bytes(i) & 0xff) >= 128
      if (cur != prev) c += 1
      prev = cur
      i += 1
    }
    c
  }

  /** Per-frame RMS of (x − 128) over frames of `frameLen` samples (last
    * frame may be partial): sqrt(Σd² / len) — integer sum of squares, one
    * double division + sqrt per frame, so DuckDB reproduces it bit-for-bit. */
  def frameRms(bytes: Array[Byte], frameLen: Int): Array[Double] = {
    val n = math.max(0, bytes.length - HeaderLen)
    if (n == 0 || frameLen <= 0) return Array.empty[Double]
    val nf = (n + frameLen - 1) / frameLen
    val out = new Array[Double](nf)
    var f = 0
    while (f < nf) {
      val from = f * frameLen
      val until = math.min(n, from + frameLen)
      var sq = 0L
      var i = from
      while (i < until) {
        val d = (bytes(HeaderLen + i) & 0xff) - 128
        sq += d.toLong * d
        i += 1
      }
      out(f) = math.sqrt(sq.toDouble / (until - from))
      f += 1
    }
    out
  }

  /** PSNR in dB between two equally-sized payloads (identical → 99.0 cap),
    * the audio leg of the per-row payload-fidelity gate. */
  def psnr(a: Array[Byte], b: Array[Byte]): Double = {
    val sa = decode(a); val sb = decode(b)
    require(sa.length == sb.length, "psnr: size mismatch")
    var se = 0.0
    var i = 0
    while (i < sa.length) { val d = (sa(i) - sb(i)).toDouble; se += d * d; i += 1 }
    val mse = se / sa.length
    if (mse == 0.0) 99.0 else 20.0 * math.log10(255.0 / math.sqrt(mse))
  }
}
