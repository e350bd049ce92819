package graft.multimodal

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO
import javax.sound.sampled.{AudioFormat, AudioInputStream, AudioSystem, AudioFileFormat}

/** REAL media codecs from the JDK — discovered available in this
  * environment by the round-14 probe (javax.imageio PNG/JPEG readers and
  * javax.sound WAV, both present in java.desktop; ffmpeg/javacv remain
  * absent, so video decode stays honestly stubbed).
  *
  * The synthetic assets are DETERMINISTIC by id with SQL-replicable
  * generative formulas (small multipliers, no 64-bit overflow), so a
  * DuckDB oracle can recompute every published decode statistic without
  * a codec: the Spark side reads the value OUT OF THE DECODED BYTES
  * (real ImageIO / AudioSystem round trip), the oracle re-derives it
  * from the formula — if they match, the codec path demonstrably works.
  *
  * Everything here is per-row work invoked from `mapPartitions` — no
  * Spark imports, no shuffle, codec state is JVM-static; at 100 TB this
  * is a pure map-side scan of the blob column.
  */
object MediaCodec {

  // ImageIO defaults to a DISK-backed stream cache — a temp file created
  // and deleted per decode, measured 3.5× the decode itself (179 µs vs
  // 50 µs per 48×32 PNG on this box). Memory-backed caching is strictly
  // better for byte-array round trips; set once per JVM at class load.
  javax.imageio.ImageIO.setUseCache(false)

  // ------------------------------------------------------------- images

  /** Generative image geometry/colors for asset `id` — the single source
    * of truth both the encoder and the SQL oracles derive from.
    * Two-tone: left half (floor(w/2) columns) solid color A, right half
    * solid color B. Dims small (16..63 × 16..47) so a corpus-sized
    * fixture encodes in seconds.
    */
  def imageWidth(id: Long): Int = 16 + (Math.floorMod(id, 48L)).toInt
  def imageHeight(id: Long): Int = 16 + (Math.floorMod(id / 3, 32L)).toInt
  def colorA(id: Long): (Int, Int, Int) =
    (Math.floorMod(id * 37, 256L).toInt,
     Math.floorMod(id * 59 + 11, 256L).toInt,
     Math.floorMod(id * 83 + 7, 256L).toInt)
  def colorB(id: Long): (Int, Int, Int) =
    (Math.floorMod(id * 101 + 3, 256L).toInt,
     Math.floorMod(id * 131 + 29, 256L).toInt,
     Math.floorMod(id * 151 + 101, 256L).toInt)

  private def rgb(c: (Int, Int, Int)): Int = (c._1 << 16) | (c._2 << 8) | c._3

  /** Real PNG bytes for asset `id` (ImageIO encoder). */
  def encodePng(id: Long): Array[Byte] = {
    val w = imageWidth(id); val h = imageHeight(id)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val a = rgb(colorA(id)); val b = rgb(colorB(id))
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, if (x < w / 2) a else b); x += 1 }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Decoded-image statistics, computed from the PIXELS a real ImageIO
    * decode produced: dims plus exact per-channel means scaled by
    * (width*height) — published as exact integer channel SUMS so no
    * float rounding contract is needed between engines.
    */
  final case class ImageStats(width: Int, height: Int,
                              sumR: Long, sumG: Long, sumB: Long)

  /** The whole raster as packed sRGB ints in ONE bulk grab:
    * `img.getRGB(x, y)` per pixel pays a virtual color-model conversion
    * call per pixel; the bulk overload routes through the same
    * ColorModel.getRGB conversion and yields bit-identical values, one
    * array pass instead of w·h calls (measured ~3-10× on the decode
    * scans, which are the m-family's dominant per-row cost).
    */
  private def rgbAll(img: BufferedImage): Array[Int] =
    img.getRGB(0, 0, img.getWidth, img.getHeight, null, 0, img.getWidth)

  /** Exact per-channel pixel sums of a decoded raster — the one loop
    * every decode-statistics path shares.
    */
  private def channelSums(img: BufferedImage): (Long, Long, Long) = {
    val px = rgbAll(img)
    var (sr, sg, sb) = (0L, 0L, 0L)
    var i = 0
    while (i < px.length) {
      val p = px(i)
      sr += (p >> 16) & 0xFF; sg += (p >> 8) & 0xFF; sb += p & 0xFF
      i += 1
    }
    (sr, sg, sb)
  }

  def decodeStats(pngBytes: Array[Byte]): ImageStats = {
    val img = ImageIO.read(new ByteArrayInputStream(pngBytes))
    require(img != null, "ImageIO could not decode the blob")
    val (sr, sg, sb) = channelSums(img)
    ImageStats(img.getWidth, img.getHeight, sr, sg, sb)
  }

  /** Real resize: decode → nearest-neighbor scale so `maxSide` bounds the
    * longer edge (aspect preserved, never upscaled) → re-encode PNG.
    * Nearest-neighbor is chosen deliberately: a two-tone source stays
    * exactly two-tone, so the oracle can reason about the output pixels
    * (an interpolating kernel would make boundary pixels
    * engine-unreplicable). Output dims floor(src*scale) with a 1px floor
    * — plain integer arithmetic the oracle mirrors.
    */
  def resizeDims(w: Int, h: Int, maxSide: Int): (Int, Int) =
    if (w <= maxSide && h <= maxSide) (w, h)
    else {
      val scale = maxSide.toDouble / math.max(w, h)
      (math.max(1, (w * scale).toInt), math.max(1, (h * scale).toInt))
    }

  def resizePng(pngBytes: Array[Byte], maxSide: Int): Array[Byte] = {
    val img = ImageIO.read(new ByteArrayInputStream(pngBytes))
    require(img != null, "ImageIO could not decode the blob")
    val (nw, nh) = resizeDims(img.getWidth, img.getHeight, maxSide)
    if (nw == img.getWidth && nh == img.getHeight) return pngBytes
    // manual nearest-neighbor (src = dst * srcDim / dstDim, integer
    // floor), NOT Graphics2D: the AWT scaler's pixel mapping is
    // implementation-defined, and the oracle needs to reason about
    // exactly which source pixel lands at each output position
    val out = new BufferedImage(nw, nh, BufferedImage.TYPE_INT_RGB)
    val src = rgbAll(img) // one bulk conversion; values identical to getRGB(x, y)
    val dst = new Array[Int](nw * nh)
    var y = 0
    while (y < nh) {
      val sy = (y.toLong * img.getHeight / nh).toInt
      val srow = sy * img.getWidth
      var x = 0
      while (x < nw) {
        dst(y * nw + x) = src(srow + (x.toLong * img.getWidth / nw).toInt)
        x += 1
      }
      y += 1
    }
    out.setRGB(0, 0, nw, nh, dst, 0, nw)
    val bos = new ByteArrayOutputStream()
    ImageIO.write(out, "png", bos)
    bos.toByteArray
  }

  /** Dimensions via the codec's HEADER probe (`ImageReader.getWidth`),
    * without decoding the raster — the right tool when only dims are
    * published: a full `ImageIO.read` + per-pixel scan would pay
    * O(w·h) work the projection throws away.
    */
  def decodeDims(bytes: Array[Byte]): (Int, Int) = {
    val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
    try {
      val readers = ImageIO.getImageReaders(iis)
      require(readers.hasNext, "no ImageReader for blob")
      val r = readers.next()
      try { r.setInput(iis); (r.getWidth(0), r.getHeight(0)) }
      finally r.dispose()
    } finally iis.close()
  }

  /** Real JPEG bytes for asset `id` — the same two-tone content through
    * the JDK's second image codec. JPEG is LOSSY: dims round-trip
    * exactly (the m11 oracle surface); pixel values only approximately
    * (DCT + chroma subsampling), so channel sums are spec-gated within a
    * tolerance instead of oracle-replayed.
    */
  def encodeJpeg(id: Long): Array[Byte] = {
    val img = ImageIO.read(new ByteArrayInputStream(encodePng(id)))
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  /** Byte-stream variant of asset `id`'s PNG: a spec-conformant `tEXt`
    * metadata chunk spliced before IEND — pixel-identical content,
    * different file bytes (the "same image, different file" shape a
    * crawler sees constantly and byte-level dedup (m4) cannot catch).
    * A chunk splice rather than a re-encode because ImageIO's PNG
    * writer normalizes raster layouts to identical output bytes.
    */
  def encodePngVariant(id: Long): Array[Byte] = {
    val base = encodePng(id)
    val typ = "tEXt".getBytes("ISO-8859-1")
    val payload = ("Comment".getBytes("ISO-8859-1") :+ 0.toByte) ++
      s"graft-variant-$id".getBytes("ISO-8859-1")
    val crc = new java.util.zip.CRC32
    crc.update(typ); crc.update(payload)
    val chunk = java.nio.ByteBuffer.allocate(12 + payload.length)
    chunk.putInt(payload.length).put(typ).put(payload).putInt(crc.getValue.toInt)
    val iend = base.length - 12 // IEND is always the final 12-byte chunk
    base.take(iend) ++ chunk.array() ++ base.drop(iend)
  }

  /** Canonical digest of the DECODED pixel content: md5 over
    * (width, height, row-major RGB ints). Identical pixels → identical
    * digest regardless of how the bytes were encoded, so grouping on it
    * is content-addressed dedup at the pixel level.
    */
  def pixelDigestHex(img: BufferedImage): String = {
    val w = img.getWidth; val h = img.getHeight
    val bb = java.nio.ByteBuffer.allocate(8 + w * h * 4)
    bb.putInt(w); bb.putInt(h)
    val px = rgbAll(img)
    var i = 0
    while (i < px.length) { bb.putInt(px(i) & 0xFFFFFF); i += 1 }
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(bb.array()).map("%02x".format(_)).mkString
  }

  // --------------------------------------- motion frames (animated GIF)

  /** Animated-GIF fixtures — REAL multi-frame motion decode with a JDK
    * codec (the closest this environment gets to video: no ffmpeg, but
    * GIF is a genuine moving-picture container ImageIO reads and writes
    * natively, frame by frame). Asset `id` has `2 + id % 4` solid
    * frames whose colors are small-multiplier formulas, so every
    * decoded frame statistic is SQL-replicable.
    */
  val gifWidth = 24
  val gifHeight = 16

  // provider SPIs resolved ONCE (the wavReader discipline): the ImageIO
  // registry lookup is unsynchronized but still a per-row iteration +
  // instantiation across a 500k-asset scan; createReaderInstance /
  // createWriterInstance per call keeps codec state per-row (readers and
  // writers are stateful and not thread-safe — only the SPI is shared)
  private lazy val gifReaderSpi =
    ImageIO.getImageReadersByFormatName("gif").next().getOriginatingProvider
  private lazy val gifWriterSpi =
    ImageIO.getImageWritersByFormatName("gif").next().getOriginatingProvider
  def gifFrameCount(id: Long): Int = 2 + Math.floorMod(id, 4L).toInt
  def gifFrameColor(id: Long, f: Int): (Int, Int, Int) =
    (Math.floorMod(id * 43 + f * 17 + 5, 256L).toInt,
     Math.floorMod(id * 67 + f * 29 + 11, 256L).toInt,
     Math.floorMod(id * 89 + f * 41 + 23, 256L).toInt)

  def encodeGif(id: Long): Array[Byte] = {
    val w = gifWriterSpi.createWriterInstance()
    val bos = new ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(bos)
    try {
      w.setOutput(ios)
      w.prepareWriteSequence(null)
      var f = 0
      val n = gifFrameCount(id)
      while (f < n) {
        val img = new BufferedImage(gifWidth, gifHeight, BufferedImage.TYPE_INT_RGB)
        val c = gifFrameColor(id, f)
        val rgbVal = (c._1 << 16) | (c._2 << 8) | c._3
        var y = 0
        while (y < gifHeight) {
          var x = 0
          while (x < gifWidth) { img.setRGB(x, y, rgbVal); x += 1 }
          y += 1
        }
        w.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
        f += 1
      }
      w.endWriteSequence()
    } finally { ios.close(); w.dispose() }
    bos.toByteArray
  }

  /** Per-frame statistics from a REAL frame-by-frame GIF decode: for
    * each frame, dims and exact per-channel means computed from the
    * decoded raster (solid fixture frames make the mean the formula
    * color exactly — integer division is exact when sum = n·v).
    */
  final case class FrameStats(frameIdx: Int, width: Int, height: Int,
                              meanR: Int, meanG: Int, meanB: Int)

  def decodeGifFrames(gifBytes: Array[Byte]): Seq[FrameStats] = {
    val r = gifReaderSpi.createReaderInstance()
    val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(gifBytes))
    try {
      r.setInput(iis)
      (0 until r.getNumImages(true)).map(f => frameStatsAt(r, f))
    } finally { iis.close(); r.dispose() }
  }

  private def frameStatsAt(r: javax.imageio.ImageReader, f: Int): FrameStats = {
    val img = r.read(f)
    val (sr, sg, sb) = channelSums(img)
    val px = img.getWidth.toLong * img.getHeight
    FrameStats(f, img.getWidth, img.getHeight,
      (sr / px).toInt, (sg / px).toInt, (sb / px).toInt)
  }

  /** Evenly-spaced frame SAMPLE stats in one reader pass: frame count
    * from the stream, then ONLY the distinct floor(F·i/n) frames are
    * decoded — O(n) raster work however long the animation is (the
    * all-frames decode pays O(F)). Frameless/truncated blobs yield an
    * empty sample rather than an index error.
    */
  def sampleGifFrameStats(gifBytes: Array[Byte], n: Int): Seq[(Int, FrameStats)] = {
    require(n > 0, s"sampleGifFrameStats needs n > 0, got $n")
    val r = gifReaderSpi.createReaderInstance()
    val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(gifBytes))
    try {
      r.setInput(iis)
      val nf = r.getNumImages(true)
      if (nf <= 0) Seq.empty
      else {
        val wanted = (0 until n).map(i => i -> nf * i / n)
        val stats = wanted.map(_._2).distinct.map(f => f -> frameStatsAt(r, f)).toMap
        wanted.map { case (i, f) => (i, stats(f)) }
      }
    } finally { iis.close(); r.dispose() }
  }

  // --------------------------------------------------- perceptual hash

  /** Grid fixtures for the perceptual-hash family: 64×64 images of 8×8
    * solid GRAY cells whose luma is a small-multiplier formula — so the
    * average-hash bits themselves are SQL-replicable (each decoded cell
    * mean equals the formula value exactly; gray makes any luma
    * weighting exact: (v·a+v·b+v·c)/(a+b+c) = v).
    */
  val gridSide = 64
  def cellLuma(id: Long, cx: Int, cy: Int): Int =
    Math.floorMod((id * 31 + cx * 7 + cy * 13) * 37, 256L).toInt

  /** Render a 64-entry gray cell-luma array as the 64×64 8×8-block grid
    * PNG — the shared raster step of every grid-fixture encoder.
    */
  private def renderGridPng(luma: Array[Int]): Array[Byte] = {
    val img = new BufferedImage(gridSide, gridSide, BufferedImage.TYPE_INT_RGB)
    var cy = 0
    while (cy < 8) {
      var cx = 0
      while (cx < 8) {
        val v = luma(cy * 8 + cx)
        val rgb = (v << 16) | (v << 8) | v
        var y = cy * 8
        while (y < (cy + 1) * 8) {
          var x = cx * 8
          while (x < (cx + 1) * 8) { img.setRGB(x, y, rgb); x += 1 }
          y += 1
        }
        cx += 1
      }
      cy += 1
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  def encodeGridPng(id: Long): Array[Byte] =
    renderGridPng(Array.tabulate(64)(c => cellLuma(id, c % 8, c / 8)))

  /** Grid fixture with a SQL-replicable cell-inversion mask: cell `c` is
    * luma-inverted iff `(id + c) % maskMod == 0`. Unlike the seed
    * dimension (whose uniform luma shifts leave the above-mean bit
    * pattern inside one 64-hash family), the mask flips individual
    * cells, so masked assets are genuinely NEW perceptions at small
    * hamming from the unmasked family — and the oracle can recompute
    * every bit (the mask is plain modular arithmetic, no PRNG).
    */
  def encodeGridPngMasked(id: Long, seedMod: Int = 101, maskMod: Int = 24): Array[Byte] =
    renderGridPng(Array.tabulate(64) { c =>
      val v = cellLuma(id % seedMod, c % 8, c / 8)
      if ((id + c) % maskMod == 0) 255 - v else v
    })

  /** splitmix64 finalizer (public-domain mix), for deterministic variant
    * cell choices below.
    */
  private def mix64(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** A perceptual VARIANT of [[encodeGridPng]]'s seed content: the same
    * 8×8 grid with a few cells' luma INVERTED (v → 255 − v), the flipped
    * cells drawn deterministically from (seed, variant). This is the
    * "same photo, many re-encodes with small raster edits" cluster shape
    * of a natural crawl: each variant decodes to a raster whose
    * average-hash differs from the base in ≈ flip-count bits (inverting
    * a cell moves its luma across the global mean except for mid-gray
    * cells), so a seed's variants form a hamming-clustered perception
    * family whose DISTINCT hash count GROWS with the variant space — the
    * corpus shape the perceptual distinct-universe argument does not
    * bound by itself, built so the scale probe can measure the capped
    * hash-pair join against it. `variant = 0` reproduces the base image
    * byte-for-byte; `variant > 0` flips `1 + (variant − 1) % maxFlips`
    * distinct cells.
    */
  def encodeGridPngVariant(seed: Long, variant: Long, maxFlips: Int = 3): Array[Byte] = {
    require(maxFlips >= 1 && maxFlips <= 64, s"maxFlips in [1,64], got $maxFlips")
    val luma = new Array[Int](64)
    var c = 0
    while (c < 64) { luma(c) = cellLuma(seed, c % 8, c / 8); c += 1 }
    if (variant != 0L) {
      val nFlips = 1 + Math.floorMod(variant - 1, maxFlips.toLong).toInt
      val picked = new Array[Int](nFlips)
      var k = 0; var probe = 0L
      while (k < nFlips) {
        val cell = Math.floorMod(mix64(seed * 1000003L + variant * 64L + probe), 64L).toInt
        probe += 1
        if (!picked.take(k).contains(cell)) { picked(k) = cell; k += 1 }
      }
      picked.foreach(cell => luma(cell) = 255 - luma(cell))
    }
    renderGridPng(luma)
  }

  /** 64-bit average-hash of a decoded image, returned as two unsigned
    * 32-bit halves (hi = bits 32..63 i.e. cells cy 4..7, lo = bits
    * 0..31) so an engine without unsigned 64-bit arithmetic can replay
    * the bits without sign games. Bit (cy·8+cx) is set iff the 8×8-grid
    * cell's mean luma strictly exceeds the global mean — compared
    * CROSS-MULTIPLIED in exact integers (blockSum·totalPixels >
    * totalSum·blockPixels), so no division rounding contract is needed.
    * Luma = (299r + 587g + 114b)/1000 integer floor (exact for gray).
    */
  def averageHash(img: BufferedImage): (Long, Long) = {
    val w = img.getWidth; val h = img.getHeight
    val blockSums = new Array[Long](64)
    val blockPx = new Array[Long](64)
    var totalSum = 0L
    val px = rgbAll(img) // one bulk conversion; values identical to getRGB(x, y)
    var y = 0
    while (y < h) {
      val cy = math.min(y * 8 / h, 7)
      val row = y * w
      var x = 0
      while (x < w) {
        val cx = math.min(x * 8 / w, 7)
        val p = px(row + x)
        val luma = (((p >> 16) & 0xFF) * 299 + ((p >> 8) & 0xFF) * 587 +
          (p & 0xFF) * 114) / 1000
        val c = cy * 8 + cx
        blockSums(c) += luma
        blockPx(c) += 1
        totalSum += luma
        x += 1
      }
      y += 1
    }
    val totalPx = w.toLong * h
    var hi = 0L; var lo = 0L
    var c = 0
    while (c < 64) {
      if (blockSums(c) * totalPx > totalSum * blockPx(c)) {
        if (c >= 32) hi |= 1L << (c - 32) else lo |= 1L << c
      }
      c += 1
    }
    (hi, lo)
  }

  // -------------------------------------------------------------- audio

  /** Generative audio for asset `id`: 8 kHz mono 16-bit PCM square wave,
    * period 16 samples (8 at +amp, 8 at −amp) — every sample's magnitude
    * is exactly `amp`, so peak and mean |sample| are formula constants
    * the oracle recomputes without decoding.
    */
  val sampleRate = 8000
  def audioSamples(id: Long): Int = 800 + Math.floorMod(id, 1600L).toInt
  def audioAmp(id: Long): Int = 1000 + Math.floorMod(id * 7, 9000L).toInt

  /** Real RIFF/WAV bytes via javax.sound (PCM_SIGNED 16-bit LE mono). */
  def encodeWav(id: Long): Array[Byte] = {
    val n = audioSamples(id); val amp = audioAmp(id)
    val pcm = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val v = if ((i / 8) % 2 == 0) amp else -amp
      pcm(i * 2) = (v & 0xFF).toByte
      pcm(i * 2 + 1) = ((v >> 8) & 0xFF).toByte
      i += 1
    }
    val fmt = new AudioFormat(sampleRate.toFloat, 16, 1, true, false)
    val ais = new AudioInputStream(new ByteArrayInputStream(pcm), fmt, n.toLong)
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  // -------------------------------------- amplitude-modulated audio (AM)

  /** Envelope-fixture geometry: 64 windows × 256 samples of square wave
    * whose per-window amplitude follows a small-multiplier formula — the
    * audio twin of the grid-image fixture ([[cellLuma]]): every envelope
    * bit is SQL-replicable because each window's mean |sample| IS its
    * amplitude exactly.
    */
  val envWindows = 64
  val envWindowSamples = 256
  def windowAmp(id: Long, w: Int): Int =
    Math.floorMod((id * 29 + w * 11) * 53, 4096L).toInt + 256

  /** Real RIFF/WAV bytes with a formula-driven amplitude ENVELOPE:
    * window `w` of [[envWindowSamples]] samples is a square wave at
    * ±[[windowAmp]](id, w). Same real javax.sound encode as
    * [[encodeWav]].
    */
  def encodeWavAm(id: Long): Array[Byte] =
    encodeAmEnvelope(Array.tabulate(envWindows)(w => windowAmp(id, w)))

  /** Variant stream of [[encodeWavAm]] — the audio twin of
    * [[encodeGridPngVariant]]: `variant = 0` reproduces the base asset
    * byte-for-byte; `variant > 0` MIRRORS `1 + (variant − 1) % maxFlips`
    * distinct windows' amplitudes within the [[windowAmp]] range
    * (amp → 4607 − amp, the reflection around the range midpoint of
    * [256, 4351]), so a window on one side of the corpus-mean envelope
    * crosses to the other and its hash bit flips — distinct
    * near-identical envelope PERCEPTIONS of the same seed content, the
    * "same track, lightly re-mastered" crawl shape whose per-cluster
    * distinct-hash growth the scale probe measures against the capped
    * pair join.
    */
  def encodeWavAmVariant(seed: Long, variant: Long, maxFlips: Int = 3): Array[Byte] = {
    require(maxFlips >= 1 && maxFlips <= envWindows,
      s"maxFlips in [1, $envWindows], got $maxFlips")
    val amps = Array.tabulate(envWindows)(w => windowAmp(seed, w))
    if (variant != 0L) {
      val nFlips = 1 + Math.floorMod(variant - 1, maxFlips.toLong).toInt
      val picked = new Array[Int](nFlips)
      var k = 0; var probe = 0L
      while (k < nFlips) {
        val w = Math.floorMod(mix64(seed * 1000003L + variant * 64L + probe),
          envWindows.toLong).toInt
        probe += 1
        if (!picked.take(k).contains(w)) { picked(k) = w; k += 1 }
      }
      picked.foreach(w => amps(w) = 4607 - amps(w))
    }
    encodeAmEnvelope(amps)
  }

  private def encodeAmEnvelope(amps: Array[Int]): Array[Byte] = {
    val n = envWindows * envWindowSamples
    val pcm = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val amp = amps(i / envWindowSamples)
      val v = if ((i / 8) % 2 == 0) amp else -amp
      pcm(i * 2) = (v & 0xFF).toByte
      pcm(i * 2 + 1) = ((v >> 8) & 0xFF).toByte
      i += 1
    }
    val fmt = new AudioFormat(sampleRate.toFloat, 16, 1, true, false)
    val ais = new AudioInputStream(new ByteArrayInputStream(pcm), fmt, n.toLong)
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** 64-bit ENVELOPE hash of decoded PCM — [[averageHash]]'s recipe on
    * sound: frames map onto 64 equal-share windows (frame i → window
    * min(i·64/n, 63)), bit w set iff window w's summed |sample| strictly
    * exceeds its equal share of the total, compared cross-multiplied in
    * exact integers (windowSum·totalFrames > totalSum·windowFrames).
    * Published as unsigned 32-bit halves like the image hash. Real
    * javax.sound decode via the lock-free [[wavReader]]; same 16-bit
    * mono guard as the other decoders.
    */
  def envelopeHash(wavBytes: Array[Byte]): (Long, Long) = {
    val ais = wavReader.getAudioInputStream(new ByteArrayInputStream(wavBytes))
    try {
      val fmt = ais.getFormat
      require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1,
        s"unexpected decoded format: $fmt")
      val bytes = ais.readAllBytes()
      val n = bytes.length / 2
      val winSums = new Array[Long](64)
      val winFrames = new Array[Long](64)
      var totalSum = 0L
      var i = 0
      while (i < n) {
        val v = ((bytes(i * 2 + 1) << 8) | (bytes(i * 2) & 0xFF)).toShort.toInt
        val w = math.min(i * 64L / n, 63L).toInt
        winSums(w) += math.abs(v)
        winFrames(w) += 1
        totalSum += math.abs(v)
        i += 1
      }
      var hi = 0L; var lo = 0L
      var w = 0
      while (w < 64) {
        if (winSums(w) * n > totalSum * winFrames(w)) {
          if (w >= 32) hi |= 1L << (w - 32) else lo |= 1L << w
        }
        w += 1
      }
      (hi, lo)
    } finally ais.close()
  }

  /** Decoded-audio statistics from a real javax.sound WAV parse: the
    * format's sample rate, the PCM frame count, and exact peak / summed
    * |sample| read out of the decoded frames.
    */
  final case class AudioStats(sampleRate: Int, nSamples: Long,
                              peak: Int, sumAbs: Long)

  /** The JDK's WAV `AudioFileReader` provider, resolved ONCE through the
    * public ServiceLoader mechanism. `AudioSystem.getAudioInputStream`
    * re-dispatches through a SYNCHRONIZED provider registry per call —
    * measured to cap 16 decode threads at 1.8× one thread (the ×100
    * probe's m7 read 136× before this). The provider object itself is
    * stateless and thread-safe; calling it directly keeps the hot path
    * lock-free while still going through the real codec.
    */
  private lazy val wavReader: javax.sound.sampled.spi.AudioFileReader = {
    import scala.jdk.CollectionConverters._
    val probe = encodeWav(0L)
    java.util.ServiceLoader.load(classOf[javax.sound.sampled.spi.AudioFileReader])
      .asScala.find { r =>
        try { r.getAudioInputStream(new ByteArrayInputStream(probe)).close(); true }
        catch { case _: Exception => false }
      }.getOrElse(throw new IllegalStateException("no WAV AudioFileReader provider"))
  }

  /** Decoded PCM cut into fixed-size windows: per window, (frame count,
    * Σ|sample|). Same real WAV parse as [[decodeWavStats]]; the window
    * arithmetic is plain integer math a SQL oracle mirrors.
    */
  def decodeWavWindows(wavBytes: Array[Byte], windowSamples: Int): Seq[(Long, Long)] = {
    val ais = wavReader.getAudioInputStream(new ByteArrayInputStream(wavBytes))
    try {
      val fmt = ais.getFormat
      // same guard as decodeWavStats: the 16-bit little-endian mono walk
      // below would silently parse a stereo or 8-bit stream into garbage
      // window sums — fail loudly instead.
      require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1,
        s"unexpected decoded format: $fmt")
      val bytes = ais.readAllBytes()
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      var n = 0L; var sumAbs = 0L
      var i = 0
      while (i + 1 < bytes.length) {
        val v = ((bytes(i + 1) << 8) | (bytes(i) & 0xFF)).toShort.toInt
        sumAbs += math.abs(v)
        n += 1
        if (n == windowSamples) { out += ((n, sumAbs)); n = 0L; sumAbs = 0L }
        i += 2
      }
      if (n > 0) out += ((n, sumAbs))
      out.toSeq
    } finally ais.close()
  }

  def decodeWavStats(wavBytes: Array[Byte]): AudioStats = {
    val ais = wavReader.getAudioInputStream(new ByteArrayInputStream(wavBytes))
    try {
      val fmt = ais.getFormat
      require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1,
        s"unexpected decoded format: $fmt")
      val bytes = ais.readAllBytes()
      var peak = 0; var sumAbs = 0L; var n = 0L
      var i = 0
      while (i + 1 < bytes.length) { // 16-bit LE frames
        val v = ((bytes(i + 1) << 8) | (bytes(i) & 0xFF)).toShort.toInt
        val a = math.abs(v)
        if (a > peak) peak = a
        sumAbs += a
        n += 1
        i += 2
      }
      AudioStats(fmt.getSampleRate.toInt, n, peak, sumAbs)
    } finally ais.close()
  }
}
