package graft.functions

/** Deterministic toy video codec — the video leg of the multimodal payload
  * path (decode stubbed deterministically per the build brief; the Spark
  * side — binary container column, frame-sample operator, per-frame feature
  * plumbing — is real).
  *
  * Container: magic(4)="GV01" ++ nFrames(2, big-endian) ++ w(2) ++ h(2) ++
  * nFrames × (w·h) gray frames, frame-major. Frame f's pixels reuse the
  * image generator with a per-frame seed, so consecutive frames differ but
  * deterministically.
  *
  * [[extractFrame]] re-encodes a stored frame as a LOSSLESS [[ImageCodec]]
  * payload by copying the stored bytes (never regenerating), so every
  * downstream image expression (brightness, histogram, resize, PSNR)
  * composes over sampled frames — and a DuckDB oracle re-deriving features
  * from the container's hex agrees bit-for-bit. */
object VideoCodec {
  val Magic = "GV01"
  val HeaderLen = 10

  def encode(seed: Long, nFrames: Int, w: Int, h: Int): Array[Byte] = {
    val out = new Array[Byte](HeaderLen + nFrames * w * h)
    var i = 0
    while (i < 4) { out(i) = Magic.charAt(i).toByte; i += 1 }
    out(4) = ((nFrames >> 8) & 0xff).toByte; out(5) = (nFrames & 0xff).toByte
    out(6) = ((w >> 8) & 0xff).toByte; out(7) = (w & 0xff).toByte
    out(8) = ((h >> 8) & 0xff).toByte; out(9) = (h & 0xff).toByte
    var f = 0
    while (f < nFrames) {
      val fseed = ImageCodec.mix64(seed ^ (f * 0x9e3779b97f4a7c15L))
      val base = HeaderLen + f * w * h
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          out(base + y * w + x) = ImageCodec.pixelAt(fseed, x, y, w, h).toByte
          x += 1
        }
        y += 1
      }
      f += 1
    }
    out
  }

  // Total header reads (short/corrupt → 0): these run inside codegen'd
  // expressions on arbitrary binary input and must never throw.
  def frameCount(bytes: Array[Byte]): Int =
    if (bytes.length < HeaderLen) 0
    else ((bytes(4) & 0xff) << 8) | (bytes(5) & 0xff)
  def width(bytes: Array[Byte]): Int =
    if (bytes.length < HeaderLen) 0
    else ((bytes(6) & 0xff) << 8) | (bytes(7) & 0xff)
  def height(bytes: Array[Byte]): Int =
    if (bytes.length < HeaderLen) 0
    else ((bytes(8) & 0xff) << 8) | (bytes(9) & 0xff)

  /** Frame `f` as a lossless image payload (bytes COPIED from the
    * container); empty payload when out of range/corrupt. */
  def extractFrame(bytes: Array[Byte], f: Int): Array[Byte] = {
    val nf = frameCount(bytes); val w = width(bytes); val h = height(bytes)
    val need = HeaderLen + (f + 1L) * w * h
    if (f < 0 || f >= nf || bytes.length < need) return Array.empty[Byte]
    val out = new Array[Byte](ImageCodec.HeaderLen + w * h)
    var i = 0
    while (i < 4) { out(i) = ImageCodec.MagicLossless.charAt(i).toByte; i += 1 }
    out(4) = ((w >> 8) & 0xff).toByte; out(5) = (w & 0xff).toByte
    out(6) = ((h >> 8) & 0xff).toByte; out(7) = (h & 0xff).toByte
    System.arraycopy(bytes, HeaderLen + f * w * h, out, ImageCodec.HeaderLen, w * h)
    out
  }

  /** Every `stride`-th frame (0, stride, 2·stride, …) as image payloads —
    * the frame-sample stage. */
  def sampleFrames(bytes: Array[Byte], stride: Int): Array[Array[Byte]] = {
    val nf = frameCount(bytes)
    if (nf <= 0 || stride <= 0) return Array.empty
    val n = (nf + stride - 1) / stride
    val out = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) { out(i) = extractFrame(bytes, i * stride); i += 1 }
    out
  }
}
