package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.QueryModule
import graft.functions.Multimodal
import graft.sources.Tables

/** Multimodal-column queries. The corpus has no media table, so opaque
  * binary payloads are synthesized from `documents`: every 3rd doc gets a
  * REAL (decodable) 4×3 grayscale PNG, every 3rd+1 a JPEG magic prefix
  * over text bytes (sniffs as jpeg, rejected by the decoder — the
  * corrupt-payload path), the rest raw text bytes — proving container
  * sniffing, byte-length metadata, and the real ImageIO decode
  * end-to-end, including its error isolation. */
object MultimodalQueries extends QueryModule {

  /** A complete 72-byte PNG: 4×3, 8-bit grayscale, scanlines
    * (0, 64, 128, 255) — so width/height/channels and the luma
    * histogram are known constants the DuckDB oracle can state. */
  private[graft] val TinyPngHex =
    "89504E470D0A1A0A0000000D4948445200000004000000030800000000919FF11A" +
    "0000000F49444154789C63607068F8CF002700227D053EE173D90000000000" +
    "49454E44AE426082"

  /** doc → opaque binary payload (deterministic). */
  private def payload(s: SparkSession) = {
    import s.implicits._
    when($"doc_id" % 3 === 0, unhex(lit(TinyPngHex)))
      .when($"doc_id" % 3 === 1, concat(unhex(lit("FFD8FFE0")), $"text".cast("binary")))
      .otherwise($"text".cast("binary"))
  }

  /** Pure-expression media metadata (oracle-able). */
  def qMediaMeta(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .withColumn("media", payload(s))
      .select($"doc_id",
        length($"media").cast("long").as("n_bytes"),
        Multimodal.mediaKind($"media").as("kind"))
      .orderBy($"doc_id")
  }

  /** REAL decode over the same payloads: PNG rows decode to known
    * constants (4×3, 1 channel, luma histogram summing to 12), corrupt
    * jpeg-magic and raw-text rows yield null metadata — every column is
    * a deterministic function of doc_id class, so the whole query is
    * DuckDB-oracled. */
  def qMediaFeatures(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val media = Tables.documents(s, dir)
      .select($"doc_id", payload(s).as("media"))
    Multimodal.decodeFeatures(media, "media", dim = 8, nFrames = 2)
      .select($"doc_id", $"width", $"height", $"channels",
        size($"frames").cast("long").as("n_frames"),
        round(aggregate($"features", lit(0.0),
          (acc, x) => acc + x.cast("double")), 4).as("feat_sum"))
      .orderBy($"doc_id")
  }

  /** The q381 chunk-walk iteration cap: a metadata pass publishes a
    * BOUNDED inventory (first 8 chunks) — the contract a real corpus
    * raises, never removes; unbounded in-row loops are how a crafted
    * payload turns a metadata scan into a DoS. */
  private val PngWalkCap = 8

  /** PNG structural-metadata extraction (q381) — the EXIF-class
    * container-metadata op (round-15 widening): parse the image
    * CONTAINER without decoding pixels — IHDR fields
    * (width/height/bit-depth/color-type at their fixed offsets,
    * big-endian) plus a bounded CHUNK WALK (each chunk's length read
    * from its own header, offset advanced length+12) publishing the
    * chunk inventory and IDAT byte mass. This is the pass a 100 TB
    * media pipeline runs FIRST — pure byte arithmetic at scan speed,
    * no decoder, no allocation — to route/filter payloads before any
    * expensive decode (q61) touches them. Everything is Spark SQL
    * byte-slicing (substring/hex/conv) inside one codegen'd
    * projection: the walk is an `aggregate` fold over a constant
    * 8-step spine carrying (offset, count, idat, types) — in-row
    * state, no explode, no shuffle. Non-PNG rows (jpeg-magic, raw
    * text) publish sniff + byte length with null structure — the
    * per-record isolation contract (F4). The DuckDB oracle replays
    * the walk as a recursive CTE over the same offsets — an
    * independent reimplementation, not a constant table. */
  def qPngMeta(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val isPngSql = "hex(substring(media, 1, 8)) = '89504E470D0A1A0A'"
    def be(off: Int, len: Int) =
      s"CAST(conv(hex(substring(media, $off, $len)), 16, 10) AS BIGINT)"
    val walkSql =
      s"""CASE WHEN $isPngSql THEN aggregate(
         |  sequence(1, $PngWalkCap),
         |  named_struct('o', CAST(9 AS BIGINT), 'n', CAST(0 AS BIGINT),
         |    'idat', CAST(0 AS BIGINT),
         |    'types', CAST(array() AS ARRAY<STRING>)),
         |  (acc, i) -> IF(acc.o + 8 <= length(media) + 1,
         |    named_struct(
         |      'o', acc.o + 12 + CAST(conv(hex(substring(media,
         |        CAST(acc.o AS INT), 4)), 16, 10) AS BIGINT),
         |      'n', acc.n + CAST(1 AS BIGINT),
         |      'idat', acc.idat + IF(CAST(substring(media,
         |          CAST(acc.o + 4 AS INT), 4) AS STRING) = 'IDAT',
         |        CAST(conv(hex(substring(media, CAST(acc.o AS INT), 4)),
         |          16, 10) AS BIGINT), CAST(0 AS BIGINT)),
         |      'types', concat(acc.types, array(CAST(substring(media,
         |        CAST(acc.o + 4 AS INT), 4) AS STRING)))),
         |    acc)) END AS w""".stripMargin
    Tables.documents(s, dir)
      .select($"doc_id", payload(s).as("media"))
      .selectExpr("doc_id", "media",
        "CAST(length(media) AS BIGINT) AS n_bytes",
        s"$isPngSql AS is_png", walkSql)
      .selectExpr("doc_id", "n_bytes", "is_png",
        s"CASE WHEN is_png THEN ${be(17, 4)} END AS width",
        s"CASE WHEN is_png THEN ${be(21, 4)} END AS height",
        s"CASE WHEN is_png THEN ${be(25, 1)} END AS bit_depth",
        s"CASE WHEN is_png THEN ${be(26, 1)} END AS color_type",
        "w.n AS n_chunks", "w.idat AS idat_bytes",
        "CASE WHEN is_png THEN array_join(w.types, ',') END AS chunk_list")
      .orderBy($"doc_id")
  }

  /** A complete RIFF/AVI container: 6 flat 4×3 grayscale PNG frames
    * (lumas 0,40,80,120,160,200) standing in for MJPEG payloads. Built
    * deterministically at class-load by MediaGen (pinned deflate level),
    * so the hex literal below is stable across runs and JVMs. */
  private[graft] lazy val TinyAviHex: String = graft.functions.MediaGen.hex(
    graft.functions.MediaGen.avi(
      (0 until 6).map(i => graft.functions.MediaGen.flatGrayPng(4, 3, 40 * i)),
      width = 4, height = 3))

  /** REAL video frame sampling: every 4th doc carries the AVI, the rest
    * raw text bytes (the reject path). The engine demuxes the `movi`
    * chunk list, samples first/mid/last of the 6 frames, and decodes
    * each through ImageIO — every output column is a deterministic
    * function of doc_id class, so the whole query is DuckDB-oracled
    * (same convention as q61). */
  def qVideoFrames(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val media = Tables.documents(s, dir)
      .select($"doc_id",
        when($"doc_id" % 4 === 0, unhex(lit(TinyAviHex)))
          .otherwise($"text".cast("binary")).as("media"))
    Multimodal.videoFeatures(media, "media", nSample = 3)
      .select($"doc_id", $"v_width", $"v_height", $"n_total_frames",
        $"n_sampled", round($"luma_first", 4).as("luma_first"),
        round($"luma_mid", 4).as("luma_mid"),
        round($"luma_last", 4).as("luma_last"))
      .orderBy($"doc_id")
  }

  /** q163's pattern fixtures: a 4×3 gradient (A), a byte-level variant
    * of it whose single changed pixel stays on the same side of the
    * mean (B — different md5, SAME aHash: the pair exact dedup misses),
    * the inverted gradient (C — complementary hash), and flat gray
    * (all-zero hash). Matrices are [y][x], matching both grayPng's
    * scanline order and aHash's row-major bit layout. */
  private[graft] val PatA: Array[Array[Int]] =
    Array.tabulate(3, 4)((y, x) => 20 * (4 * y + x))
  private[graft] val PatB: Array[Array[Int]] = {
    val p = PatA.map(_.clone); p(0)(0) = 8; p
  }
  private[graft] val PatC: Array[Array[Int]] = PatA.map(_.map(v => 220 - v))

  private lazy val PngAHex = graft.functions.MediaGen.hex(
    graft.functions.MediaGen.grayPng(PatA))
  private lazy val PngBHex = graft.functions.MediaGen.hex(
    graft.functions.MediaGen.grayPng(PatB))
  private lazy val PngCHex = graft.functions.MediaGen.hex(
    graft.functions.MediaGen.grayPng(PatC))
  private lazy val PngFlatHex = graft.functions.MediaGen.hex(
    graft.functions.MediaGen.flatGrayPng(4, 3, 128))

  /** The oracle's expected hash, computed by independent plain-Scala
    * arithmetic on the literal pattern matrix (NOT the decode path —
    * if PNG round-trip or raster order ever disagreed with this, the
    * hash compare would catch it, which is the point). */
  private[graft] def patHash(px: Array[Array[Int]]): Long = {
    val flat = px.flatten
    val mean = flat.sum.toDouble / flat.length
    flat.zipWithIndex.foldLeft(0L) { case (h, (v, i)) =>
      if (v > mean) h | (1L << i) else h
    }
  }

  /** Perceptual image dedup (q163): REAL ImageIO decode → average-hash
    * (aHash) → keeper per hash bucket. The image-modality twin of q30:
    * exact byte/md5 dedup splits re-encoded or slightly-retouched
    * copies of the same picture (fixture pair A/B differs in bytes AND
    * one pixel, hashes identically); grouping on the perceptual hash
    * unifies them, exactly how LAION-scale image corpora dedup. Scale
    * shape: decode is per-partition map work (the corpus' dominant
    * cost, embarrassingly parallel), then ONE hash-keyed window for the
    * keeper — identical to the q30 exact-dedup plan with phash standing
    * in for md5. Undecodable payloads drop via the null filter (F4). */
  def qImagePhash(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val pay = when($"doc_id" % 5 === 0, unhex(lit(PngAHex)))
      .when($"doc_id" % 5 === 1, unhex(lit(PngBHex)))
      .when($"doc_id" % 5 === 2, unhex(lit(PngCHex)))
      .when($"doc_id" % 5 === 3, unhex(lit(PngFlatHex)))
      .otherwise(concat(unhex(lit("FFD8FFE0")), $"text".cast("binary")))
    val hashed = Multimodal.imageHash(
      Tables.documents(s, dir).select($"doc_id", pay.as("media")), "media")
      .filter($"phash".isNotNull)
    val byHash = org.apache.spark.sql.expressions.Window.partitionBy($"phash")
    hashed
      .withColumn("keeper", min($"doc_id").over(byHash))
      .select($"doc_id", $"phash", $"keeper",
        ($"doc_id" =!= $"keeper").as("is_dup"))
      .orderBy($"doc_id")
  }

  /** q208's planted signal: a 480-sample square wave at ±8192, period 8
    * (4 high, 4 low), 8000 Hz — every feature is exactly computable:
    * RMS = 8192 (constant magnitude), zero crossings = 480/4 − 1 = 119
    * sign flips, duration = 480/8000 = 0.06 s. */
  private[graft] def squareWave: Array[Short] =
    Array.tabulate(480)(i => if ((i / 4) % 2 == 0) 8192 else -8192)
      .map(_.toShort)

  /** Expected features from independent plain-Scala arithmetic on the
    * literal sample vector (NOT the decode path — q163's patHash
    * discipline applied to audio). */
  private[graft] def waveStats(xs: Array[Short]): (Double, Long) = {
    val rms = math.sqrt(xs.map(v => v.toDouble * v).sum / xs.length)
    val zc = xs.sliding(2).count(p => (p(0) < 0) != (p(1) < 0))
    (rms, zc.toLong)
  }

  private lazy val TinyWavHex = graft.functions.MediaGen.hex(
    graft.functions.MediaGen.wav(squareWave, 8000))

  /** REAL audio decode (q208): every 3rd doc carries a planted PCM WAV,
    * decoded through the JDK's own `AudioSystem` reader (no codec
    * beyond the JRE — the audio sibling of q61's ImageIO and q138's
    * RIFF demux, completing the image/video/audio modality row); the
    * rest carry text bytes the reader rejects into null metadata (F4).
    * Features are the audio-pipeline basics — sample rate, duration,
    * normalized RMS loudness, zero-crossing count (the crudest pitch/
    * voicedness proxy) — each a deterministic constant of the planted
    * wave, so the query is fully DuckDB-oracled with constants derived
    * by independent Scala arithmetic on the literal sample vector.
    * Decode is per-partition map work; nothing shuffles but the
    * presentation sort. */
  def qAudioFeatures(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val media = Tables.documents(s, dir)
      .select($"doc_id",
        when($"doc_id" % 3 === 0, unhex(lit(TinyWavHex)))
          .otherwise($"text".cast("binary")).as("media"))
    Multimodal.audioFeatures(media, "media")
      .select($"doc_id", $"sample_rate", $"n_samples",
        round($"n_samples" / $"sample_rate".cast("double"), 4)
          .as("duration_s"),
        round($"rms" / 32768.0, 4).as("rms_norm"),
        $"zero_crossings")
      .orderBy($"doc_id")
  }

  /** Spectral probe frequencies for q246: the planted square wave
    * (period 8 @ 8000 Hz) has its fundamental at 1000 Hz, so the
    * 1000 Hz bin must dominate 500 (absent) and 3000 (the first odd
    * harmonic sits there with 1/3 the amplitude — square-wave
    * physics, visible in the emitted magnitudes). */
  private val ProbeHz = Seq(500, 1000, 3000)

  /** Audio spectral probe (q246) — REAL frequency-domain features
    * through the same AudioSystem decode as q208: normalized
    * single-bin DFT magnitude at three probe bands plus the dominant
    * band — the band-energy fingerprint an audio-quality gate keys on
    * (silence/tone/voiced separation) and the seam a full MFCC stack
    * plugs into. Per-row map work (O(n) per probe via Goertzel in
    * production; direct sum here so the oracle replays the identical
    * float summation order on the literal fixture — q208's constant
    * discipline); rejected bytes → null row, F4. */
  def qAudioSpectrum(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val media = Tables.documents(s, dir)
      .select($"doc_id",
        when($"doc_id" % 3 === 0, unhex(lit(TinyWavHex)))
          .otherwise($"text".cast("binary")).as("media"))
    val sp = Multimodal.spectralFeatures(media, "media", ProbeHz)
    val dominant = ProbeHz.map(f => struct(col(s"m$f").as("m"),
      lit(f).as("hz")))
    sp.select($"doc_id",
        round($"m500", 4).as("m500"),
        round($"m1000", 4).as("m1000"),
        round($"m3000", 4).as("m3000"),
        when($"m500".isNotNull,
          greatest(dominant: _*).getField("hz")).as("dominant_hz"))
      .orderBy($"doc_id")
  }

  /** Scene-AVI fixture for q284: two flat-luma scenes with in-scene
    * jitter (10,12,14 | 200,198,196) — exactly one cut, at frame 4.
    * Flat frames make lumaMean EXACT (the q138 oracle convention), so
    * the cut index is a planted constant, not a float comparison. */
  private[graft] lazy val SceneAviHex: String = graft.functions.MediaGen.hex(
    graft.functions.MediaGen.avi(
      Seq(10, 12, 14, 200, 198, 196)
        .map(v => graft.functions.MediaGen.flatGrayPng(4, 3, v)),
      width = 4, height = 3))

  /** Luma-jump threshold for a scene cut — the classic pixel-domain
    * shot-boundary heuristic's knob, literal for the oracle. */
  private val SceneCutJump = 64.0

  /** 1-based frame indices opening a new scene. Guarded on length ≥ 2:
    * Spark's sequence(2, 1) runs DESCENDING ([2, 1]), so an unguarded
    * filter over a 1-frame video would evaluate element_at(_, 0) and
    * throw — a single frame is simply one scene with no cuts. */
  private[graft] def sceneCutIdx(lumas: Column): Column =
    when(size(lumas) >= 2,
      filter(sequence(lit(2), size(lumas)),
        i => abs(element_at(lumas, i) -
          element_at(lumas, i - 1)) > SceneCutJump))
      .otherwise(array().cast("array<int>"))

  /** Scene-cut detection (q284) — shot-boundary segmentation, the
    * frame-sampling upgrade every video curation pipeline runs before
    * captioning (sample per SCENE, not per stride, or long static
    * shots dominate the frame budget): decode every demuxed frame's
    * mean luma (videoFrameLumas, partition-local) and cut where the
    * adjacent-frame jump exceeds the threshold. The differentiation is
    * IN-ROW higher-order-function arithmetic over the per-video luma
    * array — no explode, no shuffle; a real pipeline swaps the luma
    * probe for a histogram/embedding delta, same plan. Cut list is
    * emitted comma-joined (q119's convention — the driver compare does
    * not hash array cells). */
  def qSceneCuts(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val media = Tables.documents(s, dir)
      .select($"doc_id",
        when($"doc_id" % 4 === 0, unhex(lit(SceneAviHex)))
          .otherwise($"text".cast("binary")).as("media"))
    val lum = Multimodal.videoFrameLumas(media, "media")
    lum
      .withColumn("cut_at", when($"f_lumas".isNotNull,
        sceneCutIdx($"f_lumas")))
      .select($"doc_id", $"n_frames",
        when($"cut_at".isNotNull,
          array_join(transform($"cut_at", _.cast("string")), ","))
          .as("cut_idx"),
        when($"cut_at".isNotNull, size($"cut_at") + 1).as("n_scenes"))
      .orderBy($"doc_id")
  }

  /** Image thumbnail resize (q344) — the RESIZE member of the
    * multimodal op set (decode / feature-extract / resize /
    * frame-sample): every decodable payload area-average-resizes to a
    * 2×2 integer luma thumb through the REAL ImageIO decode path
    * (Multimodal.thumbnail — q61's decoder, q163's pixel model), the
    * downscale step a captioning/embedding stage runs before its
    * model. Pure integer block means, so the oracle states each
    * planted pattern's expected thumb as literals computed by the SAME
    * plain-Scala arithmetic on the pattern matrix (patHash's
    * discipline — independent of the decode path being verified).
    * Decode+resize is partition-local map work; undecodable rows drop
    * via the null filter (F4). The thumb is PUBLISHED comma-joined
    * (q284's cut_idx discipline) — the driver's pandas compare cannot
    * sort/hash raw array cells, so the output contract is scalar
    * columns only (pinned in RegistrySpec). */
  def qThumbnail(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val pay = when($"doc_id" % 5 === 0, unhex(lit(PngAHex)))
      .when($"doc_id" % 5 === 1, unhex(lit(PngBHex)))
      .when($"doc_id" % 5 === 2, unhex(lit(PngCHex)))
      .when($"doc_id" % 5 === 3, unhex(lit(PngFlatHex)))
      .otherwise(concat(unhex(lit("FFD8FFE0")), $"text".cast("binary")))
    graft.functions.Multimodal.thumbnail(
      Tables.documents(s, dir).select($"doc_id", pay.as("media")),
      "media")
      .filter($"thumb".isNotNull)
      .select($"doc_id", $"img_w", $"img_h",
        array_join(transform($"thumb", _.cast("string")), ",")
          .as("thumb_csv"))
      .orderBy($"doc_id")
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q344_thumbnail" -> (qThumbnail _),
    "q284_scene_cuts" -> (qSceneCuts _),
    "q246_audio_spectrum" -> (qAudioSpectrum _),
    "q60_media_meta"     -> (qMediaMeta _),
    "q381_png_meta"      -> (qPngMeta _),
    "q61_media_features" -> (qMediaFeatures _),
    "q138_video_frames"  -> (qVideoFrames _),
    "q163_image_phash"   -> (qImagePhash _),
    "q208_audio_features" -> (qAudioFeatures _),
  )

  override def oracleSql: Map[String, String] = Map(
    // q284: planted constants — the scene AVI carries lumas
    // (10,12,14,200,198,196), flat frames decode to those exact means,
    // so the single >64 jump sits at frame 4 and every output cell is
    // a deterministic function of the doc_id class.
    "q284_scene_cuts" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id % 4 = 0 THEN CAST(6 AS BIGINT) END
        |    AS n_frames,
        |  CASE WHEN doc_id % 4 = 0 THEN '4' END AS cut_idx,
        |  CASE WHEN doc_id % 4 = 0 THEN CAST(2 AS INTEGER) END
        |    AS n_scenes
        |FROM documents ORDER BY doc_id""".stripMargin,
    // q246: INDEPENDENT closed-form constants — NOT the engine's own
    // dftMagnitude (an oracle that calls the code under test verifies
    // plumbing, not math). The planted signal is a 480-sample, period-8
    // (4 up / 4 down) ±8192 square at 8000 Hz; for probe bin
    // k = f·480/8000 (exact integers on this grid) the DFT factors
    // over the 60 periods: k not a multiple of 60 sums a full complex
    // rotation → 0; k = 60h with h even cancels; h odd gives
    // |X|/n = A / (4·sin(πh/8)). Round9Spec pins the engine's DFT sum
    // against these same constants.
    "q246_audio_spectrum" -> {
      val n = 480; val period = 8; val amp = 8192.0
      def closed(f: Int): Double = {
        val k = f * n / 8000
        val perBin = n / period
        if (k % perBin != 0 || (k / perBin) % 2 == 0) 0.0
        else amp / (4.0 * math.sin(math.Pi * (k / perBin) / period))
      }
      def m(f: Int): Double = BigDecimal(closed(f))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      val dom = ProbeHz.maxBy(f => (closed(f), f))
      s"""SELECT doc_id,
        |  CASE WHEN doc_id % 3 = 0 THEN CAST(${m(500)} AS DOUBLE) END
        |    AS m500,
        |  CASE WHEN doc_id % 3 = 0 THEN CAST(${m(1000)} AS DOUBLE) END
        |    AS m1000,
        |  CASE WHEN doc_id % 3 = 0 THEN CAST(${m(3000)} AS DOUBLE) END
        |    AS m3000,
        |  CASE WHEN doc_id % 3 = 0 THEN CAST($dom AS INTEGER) END
        |    AS dominant_hz
        |FROM documents ORDER BY doc_id""".stripMargin
    },
    // q208: the engine really decodes PCM via AudioSystem; the oracle
    // states the planted wave's constants from independent Scala
    // arithmetic on the sample vector (waveStats) — null for the
    // text-byte rows no audio reader accepts.
    "q208_audio_features" -> {
      val (rms, zc) = waveStats(squareWave)
      val rmsNorm = BigDecimal(rms / 32768.0)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      s"""SELECT doc_id,
        |  CASE WHEN doc_id % 3 = 0 THEN CAST(8000 AS INTEGER) END
        |    AS sample_rate,
        |  CASE WHEN doc_id % 3 = 0 THEN CAST(480 AS BIGINT) END
        |    AS n_samples,
        |  CASE WHEN doc_id % 3 = 0 THEN CAST(0.06 AS DOUBLE) END
        |    AS duration_s,
        |  CASE WHEN doc_id % 3 = 0 THEN CAST($rmsNorm AS DOUBLE) END
        |    AS rms_norm,
        |  CASE WHEN doc_id % 3 = 0 THEN CAST($zc AS BIGINT) END
        |    AS zero_crossings
        |FROM documents ORDER BY doc_id""".stripMargin
    },
    // q163: the engine really decodes and hashes pixels; the oracle
    // states the per-class hash constants from independent arithmetic
    // on the pattern matrices (patHash) — A and B MUST collide, C and
    // flat must not, corrupt rows drop.
    // q344: expected thumbs from the SAME pure-Scala block-mean
    // arithmetic on the pattern matrices — independent of the ImageIO
    // decode path under test (patHash's discipline). Published as the
    // comma-joined string so the driver's pandas compare can hash it.
    "q344_thumbnail" -> {
      def lits(px: Array[Array[Int]]): String =
        graft.functions.Multimodal.thumbOf(px, 2, 2).mkString(",")
      s"""WITH t AS (
        |  SELECT doc_id,
        |    CASE CAST(doc_id % 5 AS INTEGER)
        |      WHEN 0 THEN '${lits(PatA)}'
        |      WHEN 1 THEN '${lits(PatB)}'
        |      WHEN 2 THEN '${lits(PatC)}'
        |      WHEN 3 THEN '128,128,128,128'
        |      ELSE NULL END AS thumb_csv
        |  FROM documents)
        |SELECT doc_id, CAST(4 AS INTEGER) AS img_w,
        |  CAST(3 AS INTEGER) AS img_h, thumb_csv
        |FROM t WHERE thumb_csv IS NOT NULL ORDER BY doc_id""".stripMargin
    },
    "q163_image_phash" ->
      s"""WITH h AS (
        |  SELECT doc_id,
        |    CASE CAST(doc_id % 5 AS INTEGER)
        |      WHEN 0 THEN CAST(${patHash(PatA)} AS BIGINT)
        |      WHEN 1 THEN CAST(${patHash(PatB)} AS BIGINT)
        |      WHEN 2 THEN CAST(${patHash(PatC)} AS BIGINT)
        |      WHEN 3 THEN CAST(0 AS BIGINT)
        |      ELSE NULL END AS phash
        |  FROM documents),
        |d AS (SELECT doc_id, phash FROM h WHERE phash IS NOT NULL)
        |SELECT doc_id, phash,
        |  min(doc_id) OVER (PARTITION BY phash) AS keeper,
        |  doc_id <> min(doc_id) OVER (PARTITION BY phash) AS is_dup
        |FROM d ORDER BY doc_id""".stripMargin,
    "q60_media_meta" ->
      s"""WITH m AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 3 = 0 THEN unhex('$TinyPngHex')
        |         WHEN doc_id % 3 = 1 THEN unhex('FFD8FFE0') || encode(text)
        |         ELSE encode(text) END AS media
        |  FROM documents)
        |SELECT doc_id,
        | CAST(octet_length(media) AS BIGINT) AS n_bytes,
        | CASE WHEN substr(upper(hex(media)), 1, 16) LIKE '89504E47%' THEN 'png'
        |      WHEN substr(upper(hex(media)), 1, 16) LIKE 'FFD8FF%' THEN 'jpeg'
        |      WHEN substr(upper(hex(media)), 1, 16) LIKE '47494638%' THEN 'gif'
        |      WHEN substr(upper(hex(media)), 9, 8) = '66747970' THEN 'mp4'
        |      WHEN substr(upper(hex(media)), 1, 16) LIKE '494433%' THEN 'mp3'
        |      WHEN substr(upper(hex(media)), 1, 16) LIKE '52494646%' THEN 'riff'
        |      ELSE 'unknown' END AS kind
        |FROM m ORDER BY doc_id""".stripMargin,
    // q381: the chunk walk replayed as a recursive CTE over the same
    // byte offsets — an independent reimplementation, NOT a constant
    // table. DuckDB 1.0 has no BLOB substring, so the walk slices the
    // HEX image (byte o ↔ hex 2o−1), big-endian reads via '0x'||substr
    // cast, type names rebuilt with chr(); the step cap mirrors the
    // engine's 8-iteration fold.
    "q381_png_meta" ->
      s"""WITH RECURSIVE m AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 3 = 0 THEN unhex('$TinyPngHex')
        |         WHEN doc_id % 3 = 1 THEN unhex('FFD8FFE0') || encode(text)
        |         ELSE encode(text) END AS media
        |  FROM documents),
        |p2 AS (
        |  SELECT doc_id, upper(hex(media)) AS h,
        |    CAST(octet_length(media) AS BIGINT) AS n_bytes,
        |    (octet_length(media) >= 8 AND
        |     substr(upper(hex(media)), 1, 16) = '89504E470D0A1A0A')
        |      AS is_png
        |  FROM m),
        |walk AS (
        |  SELECT doc_id, CAST(9 AS BIGINT) AS o, 0 AS step
        |  FROM p2 WHERE is_png
        |  UNION ALL
        |  SELECT w.doc_id,
        |    w.o + 12 + ('0x' || substr(p.h, 2 * w.o - 1, 8))::BIGINT,
        |    w.step + 1
        |  FROM walk w JOIN p2 p USING (doc_id)
        |  WHERE w.o + 8 <= p.n_bytes + 1 AND w.step < 8),
        |chunks AS (
        |  SELECT w.doc_id, w.o,
        |    ('0x' || substr(p.h, 2 * w.o - 1, 8))::BIGINT AS clen,
        |    chr(('0x' || substr(p.h, 2 * (w.o + 4) - 1, 2))::INT) ||
        |    chr(('0x' || substr(p.h, 2 * (w.o + 4) + 1, 2))::INT) ||
        |    chr(('0x' || substr(p.h, 2 * (w.o + 4) + 3, 2))::INT) ||
        |    chr(('0x' || substr(p.h, 2 * (w.o + 4) + 5, 2))::INT)
        |      AS ctype
        |  FROM walk w JOIN p2 p USING (doc_id)
        |  WHERE w.o + 8 <= p.n_bytes + 1 AND w.step < 8),
        |cagg AS (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_chunks,
        |    CAST(sum(CASE WHEN ctype = 'IDAT' THEN clen ELSE 0 END)
        |      AS BIGINT) AS idat_bytes,
        |    string_agg(ctype, ',' ORDER BY o) AS chunk_list
        |  FROM chunks GROUP BY doc_id)
        |SELECT p.doc_id, p.n_bytes, p.is_png,
        |  CASE WHEN is_png THEN
        |    ('0x' || substr(h, 33, 8))::BIGINT END AS width,
        |  CASE WHEN is_png THEN
        |    ('0x' || substr(h, 41, 8))::BIGINT END AS height,
        |  CASE WHEN is_png THEN
        |    ('0x' || substr(h, 49, 2))::BIGINT END AS bit_depth,
        |  CASE WHEN is_png THEN
        |    ('0x' || substr(h, 51, 2))::BIGINT END AS color_type,
        |  c.n_chunks, c.idat_bytes, c.chunk_list
        |FROM p2 p LEFT JOIN cagg c USING (doc_id)
        |ORDER BY p.doc_id""".stripMargin,
    // q61: the engine really decodes; the oracle states the known
    // constants of the planted 4×3 grayscale PNG (decode succeeds only
    // there — jpeg-magic-over-text and raw text are rejected by every
    // reader) and replays sampleFrames' window-count arithmetic.
    "q61_media_features" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id % 3 = 0 THEN CAST(4 AS INTEGER) END AS width,
        |  CASE WHEN doc_id % 3 = 0 THEN CAST(3 AS INTEGER) END AS height,
        |  CASE WHEN doc_id % 3 = 0 THEN CAST(1 AS INTEGER) END AS channels,
        |  CAST(CASE WHEN doc_id % 3 <> 2 THEN 2
        |       WHEN octet_length(encode(text)) = 0 THEN 0
        |       WHEN octet_length(encode(text)) = 1 THEN 1
        |       ELSE 2 END AS BIGINT) AS n_frames,
        |  CASE WHEN doc_id % 3 = 0 THEN CAST(12.0 AS DOUBLE) END AS feat_sum
        |FROM documents ORDER BY doc_id""".stripMargin,
    // q138: the engine really demuxes + decodes; the oracle states the
    // known constants of the planted 6-frame AVI (4×3 frames, flat lumas
    // 0/40/80/120/160/200; sampling picks indices 0,2,4 → 0/80/160) and
    // nulls for the text-byte rows no demuxer accepts.
    "q138_video_frames" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id % 4 = 0 THEN CAST(4 AS INTEGER) END AS v_width,
        |  CASE WHEN doc_id % 4 = 0 THEN CAST(3 AS INTEGER) END AS v_height,
        |  CASE WHEN doc_id % 4 = 0 THEN CAST(6 AS BIGINT) END AS n_total_frames,
        |  CAST(CASE WHEN doc_id % 4 = 0 THEN 3 ELSE 0 END AS BIGINT) AS n_sampled,
        |  CASE WHEN doc_id % 4 = 0 THEN CAST(0.0 AS DOUBLE) END AS luma_first,
        |  CASE WHEN doc_id % 4 = 0 THEN CAST(80.0 AS DOUBLE) END AS luma_mid,
        |  CASE WHEN doc_id % 4 = 0 THEN CAST(160.0 AS DOUBLE) END AS luma_last
        |FROM documents ORDER BY doc_id""".stripMargin,
  )
}
