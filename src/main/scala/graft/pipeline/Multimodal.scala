package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, plus the decode/feature/frame-sample operator
  * surface a training-data pipeline needs.
  *
  * Image and audio decode are REAL: `javax.imageio` (PNG) and
  * `javax.sound.sampled` (WAV PCM) ship in the JDK and back the decode /
  * feature / fingerprint operators below (see `decodeImages` /
  * `decodePcm`). [[stubDecodeFeatures]] remains as the clearly-marked
  * deterministic fallback for codecs the JDK lacks (JPEG2000, video
  * containers, compressed audio): swapping it for a real decoder means
  * replacing one expression with a Pandas-UDF / JNI call of the same
  * signature; the plan shape does not change.
  */
object Multimodal {

  /** Canonical schema for a multimodal asset table. */
  val assetSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false), // image|audio|video
    StructField("content", BinaryType, nullable = false),  // opaque payload
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("sample_rate", IntegerType, nullable = true),
      StructField("duration_ms", LongType, nullable = true),
      StructField("codec", StringType, nullable = true))), nullable = true)))

  /** Build a deterministic synthetic asset table from the documents table
    * (payload = utf8 bytes of the text) — the test double for binary media. */
  def syntheticAssets(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id").as("asset_id"),
      when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio").otherwise("video").as("modality"),
      encode(col("text"), "UTF-8").as("content"),
      struct(
        (col("doc_id") % 1920 + 1).cast("int").as("width"),
        (col("doc_id") % 1080 + 1).cast("int").as("height"),
        lit(16000).as("sample_rate"),
        (col("n_chars") * 10).cast("long").as("duration_ms"),
        lit("stub").as("codec")).as("meta"))

  /** STUB decode → feature vector. A real implementation decodes the media
    * and runs a feature extractor; this deterministic fake derives `dims`
    * doubles from content bytes so downstream plumbing (schema, joins, ANN
    * over features) is exercised end-to-end. Hashing is the portable
    * md5-parse scheme ([[Dedup.portableHash]]) over `content ++ ":i"`, so
    * the fake features — and everything computed from them — are
    * oracle-checkable in SQL; the literal array also keeps the projection
    * out of interpreted higher-order functions. */
  def stubDecodeFeatures(content: Column, dims: Int = 8): Column =
    array((0 until dims).map { i =>
      (conv(substring(md5(concat(content, encode(lit(s":$i"), "UTF-8"))),
        1, 15), 16, 10).cast("long") % 1000000L).cast("double") / 1000000.0
    }: _*)

  /** Frame sampling for video/audio payloads: slice the binary into `n`
    * evenly-spaced windows of `frameBytes` bytes. Pure byte arithmetic —
    * the real decoder would seek by timestamp instead; the partition-
    * parallel explode shape is identical. */
  def sampleFrames(df: DataFrame, n: Int, frameBytes: Int): DataFrame = {
    val totalLen = length(col("content"))
    df.withColumn("frame_idx",
        explode(sequence(lit(0), lit(n - 1))))
      .withColumn("frame_offset",
        (col("frame_idx") * greatest(
          (totalLen - frameBytes) / math.max(n - 1, 1), lit(1))).cast("int"))
      .withColumn("frame",
        expr(s"substring(content, frame_offset + 1, $frameBytes)"))
      .where(length(col("frame")) > 0)
  }

  /** Resize stub for images: records target dims + a content-derived hash
    * as the "resized" payload fingerprint (real impl: decode→scale→encode). */
  def stubResize(df: DataFrame, w: Int, h: Int): DataFrame =
    df.withColumn("resized_meta",
        struct(lit(w).as("width"), lit(h).as("height")))
      .withColumn("resized_fingerprint", xxhash64(col("content"), lit(w), lit(h)))

  // ---------------------------------------------------------------------------
  // REAL image decode (JDK-only: javax.imageio ships PNG/JPEG/GIF/BMP codecs
  // in every JRE — no external libraries needed). The stub above remains the
  // fallback for modalities with no in-container codec (audio/video).
  // ---------------------------------------------------------------------------

  /** Deterministic synthetic PNG: pixel channel c at (x, y) is
    * `(x*31 + y*17 + seed*7 + c*11) mod 256` (c = 0/1/2 → R/G/B). PNG is
    * lossless, so a decoder must read back EXACTLY these values — which
    * makes the whole encode→decode→aggregate round trip oracle-checkable
    * from the closed-form pixel sums alone. */
  def syntheticPng(seed: Long, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val base = x * 31L + y * 17L + seed * 7L
        val r = (base % 256).toInt
        val g = ((base + 11) % 256).toInt
        val b = ((base + 22) % 256).toInt
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    baos.toByteArray
  }

  /** Decoded per-image features. Pixel-channel sums are INTEGER-exact
    * (bounded: 255 · w · h per channel), so the output is reproducible
    * bit-for-bit by any other engine computing the same sums — no float
    * fold order to worry about. width/height/channels = −1 marks an
    * undecodable payload (kept, not dropped: a curation pipeline filters
    * on it rather than silently losing rows). */
  final case class ImageFeatures(asset_id: Long, width: Int, height: Int,
                                 channels: Int, sum_r: Long, sum_g: Long,
                                 sum_b: Long)

  /** Render (asset_id, w, h) specs into real PNG payloads, executor-side.
    * Partition-parallel map — the generator never touches the driver. */
  def renderPngAssets(spark: org.apache.spark.sql.SparkSession,
                      specs: DataFrame): DataFrame = {
    import spark.implicits._
    specs.select(col("asset_id"), col("w").cast("int"), col("h").cast("int"))
      .as[(Long, Int, Int)]
      .map { case (id, w, h) => (id, syntheticPng(id, w, h)) }
      .toDF("asset_id", "content")
  }

  /** REAL decode: `javax.imageio` over the binary payload, one image per
    * row, partition-parallel. The black-box codec call is the textbook
    * case for a typed map (no Catalyst expression can decode a PNG);
    * everything before and after stays relational. Reads the raster row
    * by row via getRGB — adequate for metadata/stats extraction; a
    * throughput-critical variant would grab the raster's data buffer
    * directly, same plan shape. */
  def decodeImageFeatures(spark: org.apache.spark.sql.SparkSession,
                          assets: DataFrame): DataFrame = {
    import spark.implicits._
    assets.select(col("asset_id"), col("content"))
      .as[(Long, Array[Byte])]
      .map { case (id, bytes) =>
        val img =
          try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
          catch { case _: Exception => null }
        if (img == null) ImageFeatures(id, -1, -1, -1, 0L, 0L, 0L)
        else {
          val (w, h) = (img.getWidth, img.getHeight)
          var (sr, sg, sb) = (0L, 0L, 0L)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val rgb = img.getRGB(x, y)
              sr += (rgb >> 16) & 0xff
              sg += (rgb >> 8) & 0xff
              sb += rgb & 0xff
              x += 1
            }
            y += 1
          }
          ImageFeatures(id, w, h, img.getColorModel.getNumComponents,
            sr, sg, sb)
        }
      }
      .toDF()
  }

  // ---------------------------------------------------------------------------
  // REAL audio decode (JDK-only: javax.sound.sampled ships a WAV/PCM codec
  // in every JRE). Same contract as the PNG path: lossless format, so the
  // decode must read back exactly the synthesized samples and the whole
  // encode→decode→aggregate round trip is oracle-checkable in closed form.
  // ---------------------------------------------------------------------------

  /** Deterministic synthetic WAV (16-bit signed PCM, mono, little-endian):
    * sample `i` is `((i·31 + seed·7) mod 4001) − 2000` — a full RIFF/fmt/
    * data container a standards-compliant reader must decode bit-exactly. */
  def syntheticWav(seed: Long, rate: Int, n: Int): Array[Byte] = {
    val dataLen = n * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1)                    // PCM, mono
      .putInt(rate).putInt(rate * 2)              // byte rate
      .putShort(2).putShort(16)                   // block align, bits
    bb.put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < n) {
      bb.putShort((((i * 31L + seed * 7L) % 4001L) - 2000L).toShort)
      i += 1
    }
    bb.array()
  }

  /** Decoded per-clip features. Sample sums are INTEGER-exact (|sample| ≤
    * 32767), so the output reproduces bit-for-bit in any engine computing
    * the same sums. sample_rate/channels/bits = −1 marks an undecodable
    * payload (kept, not dropped — filter on it downstream). */
  final case class AudioFeatures(asset_id: Long, sample_rate: Int,
                                 channels: Int, bits: Int, n_samples: Long,
                                 sum_abs: Long, peak: Long)

  /** Render (asset_id, rate, n) specs into real WAV payloads,
    * partition-parallel (the generator never touches the driver). */
  def renderWavAssets(spark: org.apache.spark.sql.SparkSession,
                      specs: DataFrame): DataFrame = {
    import spark.implicits._
    specs.select(col("asset_id"), col("rate").cast("int"), col("n").cast("int"))
      .as[(Long, Int, Int)]
      .map { case (id, rate, n) => (id, syntheticWav(id, rate, n)) }
      .toDF("asset_id", "content")
  }

  /** REAL decode: `javax.sound.sampled` over the binary payload, one clip
    * per row, partition-parallel — the audio twin of
    * [[decodeImageFeatures]] (black-box codec ⇒ typed map; everything
    * around it stays relational). Streams the frames; supports the PCM
    * 16-bit case any WAV corpus normalizes to. */
  def decodeAudioFeatures(spark: org.apache.spark.sql.SparkSession,
                          assets: DataFrame): DataFrame = {
    import spark.implicits._
    assets.select(col("asset_id"), col("content"))
      .as[(Long, Array[Byte])]
      .map { case (id, bytes) =>
        try {
          val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(bytes))
          val fmt = ais.getFormat
          val pcm = ais.readAllBytes()
          if (fmt.getSampleSizeInBits != 16 ||
              fmt.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED)
            AudioFeatures(id, -1, -1, -1, 0L, 0L, 0L)
          else {
            val n = pcm.length / 2
            var (sumAbs, peak) = (0L, 0L)
            var i = 0
            while (i < n) {
              val s =
                if (fmt.isBigEndian)
                  ((pcm(2 * i) << 8) | (pcm(2 * i + 1) & 0xff)).toShort
                else
                  ((pcm(2 * i + 1) << 8) | (pcm(2 * i) & 0xff)).toShort
              val a = math.abs(s.toLong)
              sumAbs += a
              if (a > peak) peak = a
              i += 1
            }
            AudioFeatures(id, fmt.getSampleRate.toInt, fmt.getChannels,
              fmt.getSampleSizeInBits, n.toLong / fmt.getChannels, sumAbs, peak)
          }
        } catch {
          case _: Exception => AudioFeatures(id, -1, -1, -1, 0L, 0L, 0L)
        }
      }
      .toDF()
  }

  // ---------------------------------------------------------------------------
  // Perceptual image dedup: dHash over REAL decoded pixels, banded hamming
  // join — the image twin of the text near-dup family. The reference has no
  // media analytics at all; this is training-data-pipeline surface.
  // ---------------------------------------------------------------------------

  /** High-entropy deterministic PNG for near-dup fixtures: channels are
    * xorshift-multiply hashes of `b = (x·31 + y·17 + seed·7919) mod
    * (2³¹−1)` — `m = b + k_c; ((m ⊕ (m >> 13))·C_c mod 2³²) >> 24` with
    * per-channel odd constants. Every piece is load-bearing; three cheaper
    * variants measurably fail at 100k bench images:
    *  - polynomial `q(b) mod 256`: depends on b only through `b mod 256`,
    *    which inside one image is a per-image cyclic shift
    *    `(C + 31x + 17y) mod 256` — the corpus collapses to ≤256 distinct
    *    images (measured: 20M hash-equal pairs);
    *  - MIDDLE bits `(q(b)/256) mod 256`: still a function of `b mod 2¹⁶`
    *    (truncated squaring never carries low bits upward — `b² mod 2¹⁶`
    *    depends only on `b mod 2¹⁵`), so seeds 65536 apart give identical
    *    images (measured: 57k distinct hashes, 172k phantom pairs);
    *  - multiply-shift of b DIRECTLY (no xor): the hash input is affine
    *    in b, so adjacent pixels differ by the CONSTANT `31·C_c` in the
    *    multiplied space and each dHash bit degenerates into a biased
    *    wrap detector (measured: 25k distinct hashes, 4.3M phantom
    *    pairs). The xor-shift breaks the affine delta; the high product
    *    bits then mix every input bit.
    * All products stay < 2⁶³, so the DuckDB BIGINT mirror computes the
    * same values with no overflow. Images of different seeds are
    * perceptually UNRELATED — unlike the smooth [[syntheticPng]]
    * gradients, which dHash correctly judges all-similar. `rPlus00`
    * perturbs the red channel of pixel (0,0): a planted near-dup is
    * `seed = predecessor, rPlus00 > 0` and differs in at most the one
    * dHash bit that compares against (0,0). */
  def syntheticPngQuad(seed: Long, w: Int, h: Int, rPlus00: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val b = (x * 31L + y * 17L + seed * 7919L) % 2147483647L
        val rp = if (x == 0 && y == 0) rPlus00 else 0
        def ch(k: Long, c: Long): Long = {
          val m = b + k
          val t = m ^ (m >> 13)
          ((t * c) & 0xFFFFFFFFL) >>> 24
        }
        val r = (ch(1L, 2654435761L) + rp) % 256
        val g = ch(11L, 2246822519L)
        val bb = ch(22L, 3266489917L)
        img.setRGB(x, y, (r.toInt << 16) | (g.toInt << 8) | bb.toInt)
        x += 1
      }
      y += 1
    }
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    baos.toByteArray
  }

  /** Render (asset_id, seed, w, h, rplus) specs into real PNG payloads,
    * executor-side (the near-dup twin of [[renderPngAssets]]). */
  def renderPngAssetsQuad(spark: org.apache.spark.sql.SparkSession,
                          specs: DataFrame): DataFrame = {
    import spark.implicits._
    specs.select(col("asset_id"), col("seed").cast("long"),
        col("w").cast("int"), col("h").cast("int"), col("rplus").cast("int"))
      .as[(Long, Long, Int, Int, Int)]
      .map { case (id, seed, w, h, rp) =>
        (id, syntheticPngQuad(seed, w, h, rp)) }
      .toDF("asset_id", "content")
  }

  /** Per-image difference hash over REAL decoded pixels (javax.imageio):
    * bit `y·(w−1) + x` is set when the gray sum (r+g+b — comparing sums ≡
    * comparing means, no division) of pixel (x+1, y) exceeds that of
    * (x, y). Requires (w−1)·h ≤ 63 bits, keeping every bit below the
    * sign bit so the SQL mirror's `<<` semantics are identical; the
    * oracle fixture uses 9×7 → 56 bits (where `y·8+x` coincides with
    * this layout), while a 10×7 input yields the 63-bit hash whose
    * 3×21-bit bands keep radius-2 LSH occupancy sub-1 at millions of
    * images (see [[imageNearDupPairs]]'s band-width rule — production
    * resizes to the grid that matches its corpus size; [[stubResize]]
    * marks that slot). `dhash = null` marks an undecodable payload
    * (kept, not dropped, like [[decodeImageFeatures]]).
    * Partition-parallel typed map; everything downstream is relational. */
  def imageDHash(spark: org.apache.spark.sql.SparkSession,
                 assets: DataFrame): DataFrame = {
    import spark.implicits._
    assets.select(col("asset_id"), col("content"))
      .as[(Long, Array[Byte])]
      .map { case (id, bytes) =>
        val img =
          try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
          catch { case _: Exception => null }
        if (img == null) (id, None: Option[Long])
        else {
          val (w, h) = (img.getWidth, img.getHeight)
          require((w - 1) * h <= 63,
            s"dHash input must be pre-resized to ≤ 63 comparison bits, got ${w}x$h")
          def gs(x: Int, y: Int): Int = {
            val rgb = img.getRGB(x, y)
            ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
          }
          var hash = 0L
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w - 1) {
              if (gs(x + 1, y) > gs(x, y)) hash |= 1L << (y * (w - 1) + x)
              x += 1
            }
            y += 1
          }
          (id, Some(hash))
        }
      }
      .toDF("asset_id", "dhash")
  }

  /** Near-duplicate image pairs from a `(asset_id, dhash)` frame: banded
    * LSH over the hash (`bands` equal runs of 56/bands bits — any shared
    * band makes a candidate; hamming ≤ maxHamming can miss a band only if
    * every band catches a flipped bit, impossible while maxHamming <
    * bands), then an exact `bit_count(xor)` verify. The corpus shuffles by
    * (band, value) carrying only (id, hash) — 16 bytes/record at any image
    * size; the full-pair hamming work never materializes.
    *
    * BANDS MUST SHRINK (bands widen) AS THE CORPUS GROWS: expected bucket
    * occupancy is n/2^(56/bands), and the verify stage costs
    * Σ occupancy²/2 pairs per band — 7×8-bit bands mean 256 buckets/band,
    * which at 100k images is ~390/bucket and a measured 610M-record
    * candidate storm; 4×14-bit bands cut that 270× (same recall bound for
    * hamming ≤ 2). Radius > 3 at web scale wants a longer perceptual hash
    * (e.g. 128-bit pHash), not narrower bands. Undecodable rows (null
    * dhash) are excluded here — surface them via [[imageDHash]] instead.
    *
    * `maxBucket > 0` caps each (band, value) bucket at its lowest
    * `maxBucket` asset ids — the image twin of the minhash hot-bucket
    * guard: k exact copies of one logo/error-page screenshot put k members
    * in EVERY band bucket (k²/2 pairs from one image); run exact-dhash
    * dedup first and cap the remainder. The cap's window shares the band
    * join's (b, v) partitioning — no extra exchange. */
  def imageNearDupPairs(hashes: DataFrame, bands: Int,
                        maxHamming: Int, maxBucket: Int = 0): DataFrame =
    hammingNearDupPairs(hashes, "dhash", 56, bands, maxHamming, maxBucket)

  /** The modality-agnostic core of [[imageNearDupPairs]] (see its scaladoc
    * for the scaling rules — band width vs corpus size, the hot-bucket
    * cap): near-dup pairs from any `(asset_id, <hashCol>)` frame holding a
    * `bits`-wide perceptual hash with every bit below the long sign bit.
    * Shared by image dHash (56-bit) and audio window-energy fingerprints
    * (56-bit); a future 63-bit hash plugs in unchanged. */
  def hammingNearDupPairs(hashes: DataFrame, hashCol: String, bits: Int,
                          bands: Int, maxHamming: Int,
                          maxBucket: Int = 0): DataFrame = {
    require(maxHamming < bands,
      s"hamming radius $maxHamming needs > $maxHamming bands to guarantee recall")
    require(bits % bands == 0,
      s"bands must divide the $bits hash bits evenly, got $bands")
    require(bits > 0 && bits < 64, s"hash must keep bits below the sign bit, got $bits")
    val width = bits / bands
    val mask = (1L << width) - 1
    val hs = hashes.where(col(hashCol).isNotNull)
    val banded0 = hs.select(col("asset_id"),
        explode(sequence(lit(0), lit(bands - 1))).as("b"),
        col(hashCol).as("_h"))
      .select(col("asset_id"), col("b"),
        expr(s"shiftright(_h, $width * b) & $mask").as("v"))
    val banded =
      if (maxBucket <= 0) banded0
      else banded0
        .withColumn("_rk", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("b"), col("v"))
            .orderBy(col("asset_id").asc)))
        .where(col("_rk") <= maxBucket).drop("_rk")
    val cand = banded.select(col("b"), col("v"), col("asset_id").as("ida"))
      .join(banded.select(col("b"), col("v"), col("asset_id").as("idb"))
        .hint("shuffle_hash"), Seq("b", "v"))
      .where(col("ida") < col("idb"))
      .select("ida", "idb").dropDuplicates("ida", "idb")
    cand
      .join(hs.select(col("asset_id").as("ida"), col(hashCol).as("ha")), Seq("ida"))
      .join(hs.select(col("asset_id").as("idb"), col(hashCol).as("hb")), Seq("idb"))
      .select(col("ida"), col("idb"),
        bit_count(col("ha").bitwiseXOR(col("hb"))).cast("long").as("hamming"))
      .where(col("hamming") <= maxHamming)
  }

  // ---------------------------------------------------------------------------
  // Perceptual audio dedup: window-energy fingerprint over REAL decoded
  // PCM, banded hamming join — the audio twin of the image dHash family.
  // ---------------------------------------------------------------------------

  /** Deterministic synthetic WAV for near-dup fixtures: sample `i` is the
    * 12-bit xorshift-multiply hash of `(seed·1000003 + i + 1) mod (2³¹−1)`
    * — the same hash family as [[syntheticPngQuad]], for the same reason:
    * every structured alternative measurably collides. In particular a
    * gained sawtooth (`raw_i = (i·31 + seed·7) mod 4001` times a hashed
    * per-window gain ∈ 1..7) still produced 13.7k phantom near-dup pairs
    * at 100k clips: the sawtooth's per-window phase factor spans an 18×
    * range — dominating the 7× gain — and every seed walks the SAME
    * phase orbit just rotated by `7·seed mod 4001`, so near-phase seed
    * pairs agree on most energy comparisons. Per-sample hashing makes
    * window energies iid across (seed, window) and fingerprint bits fair
    * coins. Samples are non-negative (≤ 4095 + perturbation, well inside
    * a signed short), so no engine disagrees on abs/division. `ampPlus0`
    * adds a constant to every window-0 sample: a planted near-dup is
    * `seed = predecessor, ampPlus0 > 0` and differs only in window 0's
    * energy — at most fingerprint bit 0. */
  def syntheticWavSeeded(seed: Long, rate: Int, n: Int, windows: Int,
                         ampPlus0: Int): Array[Byte] = {
    require(n % windows == 0, s"fixture wants n divisible by $windows windows")
    val dataLen = n * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1)
      .putInt(rate).putInt(rate * 2)
      .putShort(2).putShort(16)
    bb.put("data".getBytes("US-ASCII")).putInt(dataLen)
    val wlen = n / windows
    var i = 0
    while (i < n) {
      val m = (seed * 1000003L + i + 1L) % 2147483647L
      val t = m ^ (m >> 13)
      val raw = ((t * 2654435761L) & 0xFFFFFFFFL) >>> 20
      val s = raw + (if (i < wlen) ampPlus0 else 0)
      bb.putShort(s.toShort)
      i += 1
    }
    bb.array()
  }

  /** Render (asset_id, seed, rate, n, windows, aplus) specs into real WAV
    * payloads, partition-parallel (the near-dup twin of
    * [[renderWavAssets]]). */
  def renderWavAssetsSeeded(spark: org.apache.spark.sql.SparkSession,
                            specs: DataFrame): DataFrame = {
    import spark.implicits._
    specs.select(col("asset_id"), col("seed").cast("long"),
        col("rate").cast("int"), col("n").cast("int"),
        col("windows").cast("int"), col("aplus").cast("int"))
      .as[(Long, Long, Int, Int, Int, Int)]
      .map { case (id, seed, rate, n, w, ap) =>
        (id, syntheticWavSeeded(seed, rate, n, w, ap)) }
      .toDF("asset_id", "content")
  }

  // ---------------------------------------------------------------------------
  // Video dedup: per-frame dHash (REAL PNG decode — no JDK video codec
  // exists, so the container decode stays a disclosed stub and a "video"
  // is its sampled-frame table) + frame-hash-set overlap join.
  // ---------------------------------------------------------------------------

  /** Near-duplicate video pairs from a `(video_id, dhash)` frame-hash
    * table (one row per sampled frame — [[sampleFrames]] marks the
    * container-decode slot; the per-frame hash is the REAL
    * [[imageDHash]]): two videos are near-dups when the Jaccard overlap
    * of their distinct frame-hash SETS reaches `minJaccardPpm` — re-
    * ordered, trimmed or re-encoded copies keep most frame hashes while
    * unrelated videos share none (a 56-bit hash collides at 2⁻⁵⁶ per
    * frame pair). Shape: the join shuffles (dhash, video_id) pairs only —
    * 16 B/record at any frame size, the video twin of the shingle-hash
    * join in text Jaccard — then per-pair shared counts hash-aggregate.
    * `maxPerHash > 0` caps how many videos one frame hash may connect
    * (the intro/outro/black-frame hazard: a standard studio card shared
    * by k videos contributes k²/2 candidate pairs; cap it and let the
    * remaining frames carry the overlap). Jaccard is ppm-exact integer
    * math, floor semantics in both engines. */
  def frameSetNearDupPairs(frameHashes: DataFrame, minJaccardPpm: Long,
                           maxPerHash: Int = 0): DataFrame = {
    val sets = frameHashes.where(col("dhash").isNotNull)
      .select(col("video_id"), col("dhash")).distinct()
    val sizes = sets.groupBy("video_id").agg(count(lit(1)).as("nf"))
    val byHash0 = sets
    val byHash =
      if (maxPerHash <= 0) byHash0
      else byHash0
        .withColumn("_rk", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("dhash")).orderBy(col("video_id").asc)))
        .where(col("_rk") <= maxPerHash).drop("_rk")
    byHash.select(col("dhash"), col("video_id").as("vida"))
      .join(byHash.select(col("dhash"), col("video_id").as("vidb"))
        .hint("shuffle_hash"), Seq("dhash"))
      .where(col("vida") < col("vidb"))
      .groupBy("vida", "vidb").agg(count(lit(1)).as("shared"))
      .join(sizes.select(col("video_id").as("vida"), col("nf").as("na")), Seq("vida"))
      .join(sizes.select(col("video_id").as("vidb"), col("nf").as("nb")), Seq("vidb"))
      .select(col("vida"), col("vidb"), col("shared"),
        expr("CAST((shared * 1000000) DIV (na + nb - shared) AS LONG)")
          .as("jaccard_ppm"))
      .where(col("jaccard_ppm") >= minJaccardPpm)
  }

  /** Per-clip audio fingerprint over REAL decoded PCM
    * (`javax.sound.sampled`, like [[decodeAudioFeatures]]): split the
    * first `windows+1` equal windows' samples (length `n/(windows+1)`
    * each, truncating a ragged tail) and set fingerprint bit `w` when
    * window `w+1`'s energy (sum of samples — the fixture is non-negative;
    * real corpora would sum |s|, same shape) exceeds window `w`'s — the
    * energy-envelope analog of dHash's gray comparisons, robust to
    * uniform gain like dHash is to brightness. `windows = 56` keeps every
    * bit below the sign bit so the SQL mirror's `<<` agrees. `afp = null`
    * marks undecodable/too-short payloads (kept, not dropped).
    * Partition-parallel typed map; everything downstream is relational —
    * near-dup pairs via [[hammingNearDupPairs]] (hashCol "afp"). */
  def audioFingerprint(spark: org.apache.spark.sql.SparkSession,
                       assets: DataFrame, windows: Int = 56): DataFrame = {
    require(windows > 0 && windows < 64,
      s"fingerprint must keep bits below the sign bit, got $windows")
    import spark.implicits._
    assets.select(col("asset_id"), col("content"))
      .as[(Long, Array[Byte])]
      .map { case (id, bytes) =>
        try {
          val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(bytes))
          val fmt = ais.getFormat
          val pcm = ais.readAllBytes()
          val n = pcm.length / 2
          val wlen = n / (windows + 1)
          if (fmt.getSampleSizeInBits != 16 ||
              fmt.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED ||
              wlen == 0)
            (id, None: Option[Long])
          else {
            val energy = new Array[Long](windows + 1)
            var i = 0
            while (i < wlen * (windows + 1)) {
              val s =
                if (fmt.isBigEndian)
                  ((pcm(2 * i) << 8) | (pcm(2 * i + 1) & 0xff)).toShort
                else
                  ((pcm(2 * i + 1) << 8) | (pcm(2 * i) & 0xff)).toShort
              energy(i / wlen) += s.toLong
              i += 1
            }
            var hash = 0L
            var w = 0
            while (w < windows) {
              if (energy(w + 1) > energy(w)) hash |= 1L << w
              w += 1
            }
            (id, Some(hash))
          }
        } catch {
          case _: Exception => (id, None: Option[Long])
        }
      }
      .toDF("asset_id", "afp")
  }
}
