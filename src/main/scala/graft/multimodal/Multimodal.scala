package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, plus batch-shaped decode/feature-extract
  * operators.
  *
  * Every modality is decoded for real, with pure-JVM codecs for public,
  * library-free formats (compressed formats like JPEG/MP3/H.264 would
  * need external codecs this environment lacks; swapping a decode body
  * for a JNI/library call changes nothing else):
  *  - IMAGE: Netpbm P5 (PGM) — `Pgm.decode`/`resizeImage` genuinely
  *    parse headers, slice rasters, nearest-neighbor resample, re-encode.
  *  - AUDIO: canonical PCM WAV (RIFF, 16-bit LE mono) — `Wav.decode`
  *    parses the chunks before frame-energy pooling.
  *  - VIDEO: motion-PGM (back-to-back P5 frames, the Netpbm frame-stream
  *    layout) — `MPgm.decodeFrames` walks the stream; `sampleFrames`
  *    extracts the frame covering each sampled offset.
  * All assets are deterministic integer functions of doc_id, so the
  * DuckDB oracles regenerate them by formula — a codec bug on either
  * side of encode/decode flips a driver hash.
  *
  * Scale notes: decoding is per-row CPU work with no shuffle; batching
  * inside `mapPartitions` amortizes per-batch setup (the Scala analogue
  * of Arrow-batched pandas UDFs) and keeps memory bounded by
  * batchSize × max asset size, independent of partition row count.
  */
object Multimodal {

  /** One media asset: opaque bytes + typed metadata. */
  case class MediaRow(doc_id: Long, modality: String, content: Array[Byte],
                      width: Int, height: Int, sample_rate: Int)

  case class MediaFeatures(doc_id: Long, modality: String, n_bytes: Int,
                           features: Array[Float])

  val FeatureDim = 8

  /** Source image side length for the fabricated assets. */
  val ImgDim = 64

  /** Netpbm P5 (PGM) codec — pure JVM, no libraries. Binary greyscale:
    * "P5" <ws> width <ws> height <ws> 255 <single ws> raster(w*h bytes).
    * (Public format; en.wikipedia.org/wiki/Netpbm#PGM_example.) */
  object Pgm {
    def encode(w: Int, h: Int, pixels: Array[Byte]): Array[Byte] = {
      require(pixels.length == w * h, s"raster ${pixels.length} != $w*$h")
      s"P5\n$w $h\n255\n".getBytes("US-ASCII") ++ pixels
    }

    /** @return (width, height, raster) */
    def decode(bytes: Array[Byte]): (Int, Int, Array[Byte]) =
      decodeAt(bytes, 0)._1

    /** Offset-aware decode for concatenated-PGM streams.
      * @return ((width, height, raster), offset past this frame) */
    def decodeAt(bytes: Array[Byte], start: Int)
        : ((Int, Int, Array[Byte]), Int) = {
      require(bytes.length >= start + 2 &&
        bytes(start) == 'P' && bytes(start + 1) == '5', "not a P5 PGM")
      var i = start + 2
      def nextInt(): Int = {
        while (Character.isWhitespace(bytes(i))) i += 1
        var v = 0
        while (i < bytes.length && !Character.isWhitespace(bytes(i))) {
          require(bytes(i) >= '0' && bytes(i) <= '9', "bad PGM header")
          v = v * 10 + (bytes(i) - '0'); i += 1
        }
        v
      }
      val w = nextInt(); val h = nextInt(); val maxVal = nextInt()
      require(maxVal == 255, s"unsupported maxval $maxVal")
      i += 1 // exactly one whitespace byte separates header and raster
      require(bytes.length >= i + w * h, "truncated PGM raster")
      ((w, h, java.util.Arrays.copyOfRange(bytes, i, i + w * h)), i + w * h)
    }
  }

  /** Motion-PGM "video": frames stored as back-to-back P5 PGMs with no
    * container header — the simplest public frame-stream layout (the
    * Netpbm tools themselves concatenate frames this way). Frame count
    * derives from stream length at decode time. */
  object MPgm {
    def encode(frames: Array[Array[Byte]], w: Int, h: Int): Array[Byte] =
      frames.flatMap(Pgm.encode(w, h, _))

    def decodeFrames(bytes: Array[Byte]): Array[(Int, Int, Array[Byte])] = {
      val out = Array.newBuilder[(Int, Int, Array[Byte])]
      var off = 0
      while (off < bytes.length) {
        val (frame, next) = Pgm.decodeAt(bytes, off)
        out += frame
        off = next
      }
      out.result()
    }
  }

  /** Deterministic video fixture — frame count and pixels are pure
    * integer functions of doc_id so the oracle regenerates them in SQL.
    * 8 fps over a 1-second asset: frame k covers [k·125, (k+1)·125) ms. */
  val VideoFps = 8
  def videoFrameCount(id: Long): Int = 4 + Math.floorMod(id, 5).toInt
  def videoPixel(id: Long, k: Int, i: Int): Byte =
    Math.floorMod(id * 7L + k.toLong * 13L + i.toLong, 256L).toByte

  /** Canonical-layout PCM WAV (RIFF) codec — mono, 16-bit little-endian,
    * 44-byte header + data. Public format (RIFF/WAVE PCM); pure JVM. */
  object Wav {
    import java.nio.{ByteBuffer, ByteOrder}

    def encode(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
      val data = 2 * samples.length
      val bb = ByteBuffer.allocate(44 + data)
        .order(ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + data)
        .put("WAVE".getBytes("US-ASCII"))
        .put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1).putShort(1) // PCM, mono
        .putInt(sampleRate).putInt(sampleRate * 2) // byte rate
        .putShort(2).putShort(16) // block align, bits/sample
        .put("data".getBytes("US-ASCII")).putInt(data)
      samples.foreach(bb.putShort)
      bb.array()
    }

    /** @return (sampleRate, samples) */
    def decode(bytes: Array[Byte]): (Int, Array[Short]) = {
      val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
      def tag(exp: String): Unit = {
        val a = new Array[Byte](4); bb.get(a)
        require(new String(a, "US-ASCII") == exp, s"missing $exp chunk")
      }
      tag("RIFF"); bb.getInt(); tag("WAVE"); tag("fmt ")
      require(bb.getInt() == 16, "unsupported fmt chunk")
      require(bb.getShort() == 1, "not PCM")
      require(bb.getShort() == 1, "not mono")
      val rate = bb.getInt()
      bb.getInt(); bb.getShort() // byte rate, block align
      require(bb.getShort() == 16, "not 16-bit")
      tag("data")
      val n = bb.getInt() / 2
      require(bytes.length >= 44 + 2 * n, "truncated WAV data")
      val out = new Array[Short](n)
      var i = 0
      while (i < n) { out(i) = bb.getShort(); i += 1 }
      (rate, out)
    }
  }

  val AudioRate = 16000

  /** Deterministic audio fixture — sample count and values are pure
    * integer functions of doc_id so the DuckDB oracle can regenerate
    * them in SQL and verify the REAL codec's round trip. */
  def audioSampleCount(id: Long): Int =
    160 + Math.floorMod(id, 41).toInt * 4

  def audioSample(id: Long, i: Int): Short =
    (Math.floorMod(id * 31L + i.toLong * 17L, 20001L) - 10000L).toShort

  /** REAL video decode + pooling: parse the motion-PGM stream, lane k =
    * raster byte sum of frame k — per-frame energies with the same /255
    * contract. (Lane sums accumulate in integers and divide by 255
    * exactly once at the end: `round(feature * 255)` then recovers the
    * integer lane sum bit-exactly — float32 relative error ~6e-8 ≪
    * 0.5/laneSum for any asset below ~8 MB/lane — which is what the
    * driver-facing oracle projection in SparkEntry relies on.) */
  private def decodeVideoFeatures(row: MediaRow): MediaFeatures = {
    val frames = MPgm.decodeFrames(row.content)
    val sums = new Array[Long](FeatureDim)
    var k = 0
    while (k < frames.length) {
      val px = frames(k)._3
      val lane = math.min(k, FeatureDim - 1)
      var i = 0
      while (i < px.length) { sums(lane) += (px(i) & 0xff); i += 1 }
      k += 1
    }
    val feats = new Array[Float](FeatureDim)
    var j = 0
    while (j < FeatureDim) { feats(j) = sums(j) / 255.0f; j += 1 }
    MediaFeatures(row.doc_id, row.modality, row.content.length, feats)
  }

  /** REAL audio decode + pooling: parse the WAV, sum |sample| over
    * FeatureDim contiguous frames (frame j = samples [j·n/dim, …)) —
    * integer frame energies with the same /255 contract as the other
    * modalities (frame sums stay far below the float32 exactness bound). */
  private def decodeAudioFeatures(row: MediaRow): MediaFeatures = {
    val (rate, s) = Wav.decode(row.content)
    require(rate == row.sample_rate, s"rate $rate != ${row.sample_rate}")
    val frameLen = math.max(s.length / FeatureDim, 1)
    val sums = new Array[Long](FeatureDim)
    var i = 0
    while (i < s.length) {
      sums(math.min(i / frameLen, FeatureDim - 1)) += math.abs(s(i).toLong)
      i += 1
    }
    val feats = new Array[Float](FeatureDim)
    var j = 0
    while (j < FeatureDim) { feats(j) = sums(j) / 255.0f; j += 1 }
    MediaFeatures(row.doc_id, row.modality, row.content.length, feats)
  }

  /** REAL image decode + pooling: parse the PGM, sum pixel intensities
    * over FeatureDim horizontal bands (rows [j·h/dim, (j+1)·h/dim)) —
    * integer band sums with the same /255 contract as the stub. */
  private def decodeImageFeatures(row: MediaRow): MediaFeatures = {
    val (w, h, px) = Pgm.decode(row.content)
    val bandRows = math.max(h / FeatureDim, 1)
    val sums = new Array[Long](FeatureDim)
    var i = 0
    while (i < px.length) {
      sums(math.min((i / w) / bandRows, FeatureDim - 1)) += (px(i) & 0xff)
      i += 1
    }
    val feats = new Array[Float](FeatureDim)
    var j = 0
    while (j < FeatureDim) { feats(j) = sums(j) / 255.0f; j += 1 }
    MediaFeatures(row.doc_id, row.modality, row.content.length, feats)
  }

  /** doc_id % 3 drives the fabricated modality; keep the mapping in one
    * place so a pre-map filter and the map itself can't drift apart. */
  private val ModalityOfMod = Map(0L -> "image", 1L -> "audio", 2L -> "video")

  /** Fabricate a media table from documents. Image rows are REAL PGM
    * assets: a 64×64 raster filled from the document's UTF-8 bytes,
    * cycled (deterministic, oracle-recomputable). Audio/video rows keep
    * the raw bytes as their opaque stand-in payload.
    *
    * `modality`, when given, filters on `doc_id % 3` BEFORE the typed map
    * so asset construction (the PGM encode is ~4 KB per image row) is
    * never paid for rows a downstream modality predicate would drop —
    * at scale that's decode-tier CPU, not a rounding error. */
  def mediaFromDocuments(docs: DataFrame,
                         modality: Option[String] = None): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val wanted = modality.map { m =>
      ModalityOfMod.collectFirst { case (k, v) if v == m => k }
        .getOrElse(throw new IllegalArgumentException(s"unknown modality $m"))
    }
    val base = wanted match {
      case Some(k) => docs.filter(pmod(col("doc_id"), lit(3)) === k)
      case None => docs
    }
    base.select(col("doc_id"), encode(col("text"), "UTF-8").as("raw"))
      .as[(Long, Array[Byte])]
      .map { case (id, raw) =>
        // floorMod, not %: Scala % is negative for negative ids, which
        // would miss the map AND disagree with the pmod-based pushdown
        // filter above — the exact drift the shared mapping prevents.
        val modality = ModalityOfMod(Math.floorMod(id, 3))
        val content =
          if (modality == "image") {
            val plane = new Array[Byte](ImgDim * ImgDim)
            if (raw.nonEmpty) {
              var i = 0
              while (i < plane.length) {
                plane(i) = raw(i % raw.length); i += 1
              }
            }
            Pgm.encode(ImgDim, ImgDim, plane)
          } else if (modality == "audio") {
            val n = audioSampleCount(id)
            val s = new Array[Short](n)
            var i = 0
            while (i < n) { s(i) = audioSample(id, i); i += 1 }
            Wav.encode(AudioRate, s)
          } else {
            val frames = Array.tabulate(videoFrameCount(id)) { k =>
              val px = new Array[Byte](ImgDim * ImgDim)
              var i = 0
              while (i < px.length) { px(i) = videoPixel(id, k, i); i += 1 }
              px
            }
            MPgm.encode(frames, ImgDim, ImgDim)
          }
        MediaRow(id, modality, content, ImgDim, ImgDim, AudioRate)
      }.toDF()
  }

  /** Batch-shaped feature extraction: partition-local, grouped into
    * fixed-size batches (the decode library's preferred call shape).
    * Every modality takes a real decode path: PGM band pooling for
    * images, WAV frame energy for audio, motion-PGM per-frame energy
    * for video. */
  def extractFeatures(media: DataFrame, batchSize: Int = 64): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow]
      .mapPartitions(_.grouped(batchSize).flatMap(_.map { r =>
        r.modality match {
          case "image" => decodeImageFeatures(r)
          case "audio" => decodeAudioFeatures(r)
          case _ => decodeVideoFeatures(r)
        }
      }))
      .toDF()
  }

  /** REAL image resize: decode the PGM, nearest-neighbor resample to
    * targetW×targetH, re-encode. */
  private def resizeImage(row: MediaRow, tw: Int, th: Int): MediaRow = {
    val (w, h, px) = Pgm.decode(row.content)
    val out = new Array[Byte](tw * th)
    var y = 0
    while (y < th) {
      val sy = y * h / th
      var x = 0
      while (x < tw) {
        out(y * tw + x) = px(sy * w + x * w / tw)
        x += 1
      }
      y += 1
    }
    row.copy(content = Pgm.encode(tw, th, out), width = tw, height = th)
  }

  /** Per-frame resize of a motion-PGM stream: decode each frame, NN
    * resample with the same kernel as the still-image path, re-encode. */
  private def resizeVideo(row: MediaRow, tw: Int, th: Int): MediaRow = {
    val out = MPgm.decodeFrames(row.content).map { case (w, h, px) =>
      val o = new Array[Byte](tw * th)
      var y = 0
      while (y < th) {
        val sy = y * h / th
        var x = 0
        while (x < tw) { o(y * tw + x) = px(sy * w + x * w / tw); x += 1 }
        y += 1
      }
      o
    }
    row.copy(content = MPgm.encode(out, tw, th), width = tw, height = th)
  }

  /** Resize visual rows to targetW×targetH — still images directly,
    * videos frame by frame; audio passes through untouched. Same
    * batch-shaped, shuffle-free execution as extractFeatures. */
  def resizeImages(media: DataFrame, targetW: Int, targetH: Int,
                   batchSize: Int = 64): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow]
      .mapPartitions(_.grouped(batchSize).flatMap(_.map { r =>
        r.modality match {
          case "image" => resizeImage(r, targetW, targetH)
          case "video" => resizeVideo(r, targetW, targetH)
          case _ => r
        }
      }))
      .toDF()
  }

  /** Byte-level checksum projection of a binary column — the cheap
    * content fingerprint that lets an oracle verify opaque asset BYTES
    * (not just shapes) without shipping them. */
  def contentByteSums(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow]
      .map { r =>
        var s = 0L
        var i = 0
        while (i < r.content.length) { s += (r.content(i) & 0xff); i += 1 }
        (r.doc_id, r.modality, r.content.length, s, r.width, r.height)
      }
      .toDF("doc_id", "modality", "n_bytes", "byte_sum", "width", "height")
  }

  // -------------------------------------------------------------------
  // Perceptual near-dup tier: dHash-style 62-bit signatures over the
  // DECODED modalities, feeding the same pigeonhole-banded Hamming
  // bucket join the text SimHash tier uses (Dedup.simhashPairsFromSig,
  // grouped by modality so an image never buckets against a WAV).
  //
  // Signature = 63 pooled cell MEANS (fixed-point, ×2^20), bit i =
  // mean(cell i+1) > mean(cell i) — the gradient-sign construction of
  // dHash. Comparing MEANS (not sums) makes the signature exactly
  // invariant to a uniform brightness shift even though edge cells have
  // different areas: every cell mean moves by the same +delta·2^20.
  // Images pool over a 9×7 spatial grid; video accumulates every
  // decoded frame into the same grid (time-pooled spatial gradient);
  // audio pools |sample| over 63 contiguous frames (energy envelope).
  //
  // Scale: signatures are one decode + O(asset) integer work per row,
  // no shuffle; candidate generation is the banded equi join —
  // O(rows × (maxDist+1)) shuffle rows, never an all-pairs compare.
  // -------------------------------------------------------------------

  val SigGridW = 9
  val SigGridH = 7
  /** 63 cells -> 62 adjacent-difference bits (62 keeps the packed value
    * positive under ANSI long arithmetic, matching the text SimHash). */
  val SigCells: Int = SigGridW * SigGridH
  private val SigScale = 1L << 20

  private def signatureFromCells(sums: Array[Long],
                                 areas: Array[Long]): Long = {
    val means = new Array[Long](SigCells)
    var i = 0
    while (i < SigCells) {
      means(i) = if (areas(i) == 0) 0L else sums(i) * SigScale / areas(i)
      i += 1
    }
    var sh = 0L
    i = 0
    while (i < SigCells - 1) {
      if (means(i + 1) > means(i)) sh |= (1L << i)
      i += 1
    }
    sh
  }

  /** Accumulate one w×h raster into the 9×7 cell sums (block pooling —
    * every pixel lands in exactly one cell). */
  private def accumulateRaster(w: Int, h: Int, px: Array[Byte],
                               sums: Array[Long], areas: Array[Long]): Unit = {
    var i = 0
    while (i < px.length) {
      val y = i / w
      val x = i - y * w
      val c = math.min(y * SigGridH / h, SigGridH - 1) * SigGridW +
        math.min(x * SigGridW / w, SigGridW - 1)
      sums(c) += (px(i) & 0xff)
      areas(c) += 1
      i += 1
    }
  }

  /** 62-bit perceptual signature of one media row (decodes for real). */
  def perceptualSig(row: MediaRow): Long = {
    val sums = new Array[Long](SigCells)
    val areas = new Array[Long](SigCells)
    row.modality match {
      case "image" =>
        val (w, h, px) = Pgm.decode(row.content)
        accumulateRaster(w, h, px, sums, areas)
      case "video" =>
        MPgm.decodeFrames(row.content).foreach { case (w, h, px) =>
          accumulateRaster(w, h, px, sums, areas)
        }
      case _ =>
        val (_, s) = Wav.decode(row.content)
        val frameLen = math.max(s.length / SigCells, 1)
        var i = 0
        while (i < s.length) {
          val c = math.min(i / frameLen, SigCells - 1)
          sums(c) += math.abs(s(i).toLong)
          areas(c) += 1
          i += 1
        }
    }
    signatureFromCells(sums, areas)
  }

  /** (doc_id, modality, sh) signature frame — shuffle-free scan tier. */
  def perceptualSigs(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow]
      .map(r => (r.doc_id, r.modality, perceptualSig(r)))
      .toDF("doc_id", "modality", "sh")
  }

  /** Every PlantEvery-th doc gets a perceptually-perturbed twin. */
  val PlantEvery = 5
  val PlantIdOffset = 10000000L

  /** A perceptual (not byte-level) perturbation per modality: +2
    * saturating brightness for rasters (UTF-8-derived image bytes never
    * reach 254, so the image shift never actually saturates and its
    * signature distance is exactly 0; video pixels span 0..255, so its
    * clipped cells drift a few fixed-point units), ×51/50 amplitude for
    * audio (uniform scaling preserves envelope order up to truncation
    * ties). Each goes through a real decode→transform→encode round trip. */
  private def perturbRow(r: MediaRow): MediaRow = r.modality match {
    case "image" =>
      val (w, h, px) = Pgm.decode(r.content)
      val out = px.map(b => math.min((b & 0xff) + 2, 255).toByte)
      r.copy(doc_id = r.doc_id + PlantIdOffset,
        content = Pgm.encode(w, h, out))
    case "video" =>
      val frames = MPgm.decodeFrames(r.content)
      val out = frames.map { case (_, _, px) =>
        px.map(b => math.min((b & 0xff) + 2, 255).toByte)
      }
      r.copy(doc_id = r.doc_id + PlantIdOffset,
        content = MPgm.encode(out, frames.head._1, frames.head._2))
    case _ =>
      val (rate, s) = Wav.decode(r.content)
      val out = s.map(v => ((v * 51) / 50).toShort)
      r.copy(doc_id = r.doc_id + PlantIdOffset,
        content = Wav.encode(rate, out))
  }

  /** Perturbed twins of every PlantEvery-th media row (the testdata has
    * no organic media duplicates, so gates plant their own — the same
    * convention as Dedup.withNearDups, and the planted id formula is
    * trivially SQL-expressible for the oracle). */
  def plantedPerceptualDups(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow]
      .filter(r => Math.floorMod(r.doc_id, PlantEvery.toLong) == 0L)
      .map(perturbRow)
      .toDF()
  }

  /** Exact-signature tier: collapse identical (modality, sh) rows to a
    * representative (min doc_id) with the class size. This runs BEFORE
    * the banded Hamming join — a duplicate class of c rows contributes
    * one representative instead of c²/2 pairs, the difference between
    * linear and quadratic output on a corpus with large exact classes
    * (the audio fixture's ~34 envelope classes here; boilerplate media
    * at 100 TB). Same architecture as text dedup: exact tier first,
    * near-dup candidates only among distinct survivors. */
  def sigGroups(media: DataFrame): DataFrame =
    perceptualSigs(media).groupBy("modality", "sh")
      .agg(min("doc_id").as("rep"), count(lit(1)).as("n_rows"))

  /** Near-duplicate pairs BETWEEN exact-signature representatives with
    * 1 ≤ Hamming ≤ maxDist — banded bucket join, never all-pairs.
    * Together with [[sigGroups]] (whose classes are the Hamming-0
    * pairs, kept implicit) this is the full near-dup relation. */
  def nearDupPairs(media: DataFrame, maxDist: Int): DataFrame =
    graft.operators.Dedup.simhashPairsFromSig(
      sigGroups(media).select(col("rep").as("doc_id"), col("sh"),
        col("modality")),
      maxDist, groupCols = Seq("modality"))

  /** Driver-checkable gate: every planted perceptual twin must be
    * recovered by the two-tier near-dup pipeline — either its signature
    * is exactly its original's (same [[sigGroups]] class; the image
    * perturbation lands here) or their representatives appear in the
    * banded [[nearDupPairs]] join (pigeonhole-exact within maxDist).
    * The oracle is the planted-pair formula itself
    * (doc_id % PlantEvery = 0 → (id, id + offset)); a codec, signature,
    * grouping, banding, or Hamming-threshold bug drops rows from the
    * output and flips the driver's hash check. */
  def nearDupGate(docs: DataFrame, maxDist: Int): DataFrame = {
    val media = mediaFromDocuments(docs)
    val all = media.unionByName(plantedPerceptualDups(media))
    val withRep = perceptualSigs(all)
      .join(sigGroups(all), Seq("modality", "sh"))
      .select(col("doc_id"), col("rep"))
    val repPairs = nearDupPairs(all, maxDist)
      .select(col("id_a").as("rep_a"), col("id_b").as("rep_b"))
    val o = withRep.filter(col("doc_id") < PlantIdOffset &&
        pmod(col("doc_id"), lit(PlantEvery.toLong)) === 0)
      .select(col("doc_id").as("id_a"), col("rep").as("rep_o"))
    val t = withRep.filter(col("doc_id") >= PlantIdOffset)
      .select(col("doc_id").as("id_b"), col("rep").as("rep_t"))
    val plantedPairs = o.join(t, o("id_a") + PlantIdOffset === t("id_b"))
    val sameClass = plantedPairs.filter(col("rep_o") === col("rep_t"))
    val crossClass = plantedPairs.filter(col("rep_o") =!= col("rep_t"))
      .withColumn("rep_a", least(col("rep_o"), col("rep_t")))
      .withColumn("rep_b", greatest(col("rep_o"), col("rep_t")))
      .join(repPairs, Seq("rep_a", "rep_b"), "left_semi")
    sameClass.select("id_a", "id_b")
      .unionByName(crossClass.select("id_a", "id_b"))
  }

  /** Hamming budget for the gate: planted twins measure ≤ 3 (spec-pinned),
    * so 6 gives ~2× corpus-drift margin, mirroring the text SimHash gate. */
  val GateMaxDist = 6

  /** REAL frame sampling for video rows: every strideMs milliseconds up
    * to durationMs, DECODE the motion-PGM stream and emit the frame
    * covering that offset (clamped to the last frame — the hold-last
    * convention) with its decoded raster byte sum, one row per sampled
    * offset. Per-row decode work, no shuffle; the sums make the
    * extraction oracle-checkable against the fixture formula. */
  def sampleFrames(media: DataFrame, durationMs: Int, strideMs: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(col("modality") === "video").as[MediaRow]
      .flatMap { r =>
        val frames = MPgm.decodeFrames(r.content)
        (0 until durationMs by strideMs).map { ms =>
          val k = math.min(ms * VideoFps / 1000, frames.length - 1)
          val px = frames(k)._3
          var s = 0L
          var i = 0
          while (i < px.length) { s += (px(i) & 0xff); i += 1 }
          (r.doc_id, ms, k, s)
        }
      }
      .toDF("doc_id", "frame_ms", "frame_idx", "frame_sum")
  }
}
