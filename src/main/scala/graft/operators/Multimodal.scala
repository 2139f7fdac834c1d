package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.{t => tbl}

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, processed by per-partition batch operators.
  *
  * IMAGE decode is REAL: the JDK ships `javax.imageio` codecs for
  * PNG/JPEG/BMP/GIF, so [[decodeImage]] does actual pixel decode (and the
  * mm_decode / mm_phash_img gates verify it end-to-end — see the image
  * section's exactness argument). WAV/PCM audio decode is REAL too
  * (`javax.sound.sampled`, gate mm_wav), and multi-frame container decode
  * is REAL via animated GIF (`writeToSequence`/per-frame reads, gate
  * mm_gif_frames — the video-frame-extraction contract on a genuine
  * multi-frame codec). COMPRESSED audio is REAL for
  * G.711 µ-law/A-law (`AudioSystem` format conversion, gate mm_ulaw).
  * Other compressed audio/video (mp3/aac/h264) remain
  * STUBS — those codecs do not ship with the JDK — implemented as
  * deterministic fakes (byte histogram / byte-PCM energy) with the exact
  * signature a real decoder (JNI/FFI to ffmpeg, or `mapInPandas`+librosa
  * on the PySpark surface) would plug into.
  *
  * Scale notes: media rows are large and skew-prone — repartition by a
  * size-aware key before decode so one executor doesn't eat all the 4K
  * videos; decode is CPU-bound so partition count should be ≥ total cores;
  * features (small) should be written to a separate table from payloads
  * (large) so downstream training reads never touch the blobs.
  */
object Multimodal {

  type Q = (SparkSession, String) => DataFrame

  val FeatureBins = 16

  /** Media-table view over documents: text payloads as binary content with
    * typed metadata — the schema any media kind (image/audio/video) uses.
    */
  def asMedia(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      lit("text/plain").as("mime"),
      encode(col("text"), "UTF-8").as("content"),
      struct(
        octet_length(col("text")).cast("long").as("n_bytes"),
        col("source").as("origin")).as("meta"))

  /** STUB media decoder: deterministic 16-bin byte histogram, normalized.
    * A real image decode/resize/feature-extract has this exact shape:
    * binary in → fixed-length Array[Double] out, batched per partition.
    */
  def decodeStub(content: Array[Byte]): Array[Double] = {
    val bins = new Array[Double](FeatureBins)
    var i = 0
    while (i < content.length) {
      bins((content(i) & 0xff) % FeatureBins) += 1.0
      i += 1
    }
    val n = math.max(1, content.length).toDouble
    bins.map(_ / n)
  }

  /** Per-partition batched feature extraction (the Scala analogue of
    * `mapInPandas`: one iterator per partition, vectorizable inside).
    */
  def extractFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val rows = media.select(col("media_id"), col("content"))
      .as[(Long, Array[Byte])]
    rows.mapPartitions { it =>
      it.map { case (id, content) => (id, decodeStub(content)) }
    }.toDF("media_id", "features")
  }

  /** Frame sampling stub: split the payload into `n` byte chunks →
    * (media_id, frame_idx, frame). Real video frame extraction explodes
    * with the same output shape.
    */
  def sampleFrames(media: DataFrame, n: Int): DataFrame =
    media.where(octet_length(col("content")) >= n)
      .select(col("media_id"),
        posexplode(split_part_bytes(col("content"), n)))
      .withColumnsRenamed(Map("pos" -> "frame_idx", "col" -> "frame"))

  // Frame length/offset use explicit floor() (not bare CAST of a double):
  // Spark CAST truncates but DuckDB CAST rounds half-even, so the oracle
  // could only mirror this arithmetic with floor spelled out on both sides.
  private def split_part_bytes(content: org.apache.spark.sql.Column, n: Int) =
    expr(s"transform(sequence(0, $n - 1), i -> " +
      s"substring(content, CAST(i * floor(octet_length(content) / $n) AS INT) + 1, " +
      s"CAST(floor(octet_length(content) / $n) AS INT)))")

  /** Gate query: metadata projection over the media view — binary plumbing
    * whose scalar shadows (lengths, first byte) DuckDB can verify.
    */
  val mediaMeta: Q = (s, d) => {
    val m = asMedia(tbl(s, d, "documents"))
    m.select(col("media_id"), col("mime"), col("meta.n_bytes").as("n_bytes"),
      col("meta.origin").as("origin"))
      .orderBy(col("media_id"))
  }
  val mediaMetaSql: String =
    """SELECT doc_id AS media_id, 'text/plain' AS mime,
      |       octet_length(encode(text)) AS n_bytes, source AS origin
      |FROM documents ORDER BY media_id""".stripMargin

  /** Gate query: stub features through the real mapPartitions path —
    * asserts the batched binary pipeline executes distributed. The stub
    * histogram is deterministic, so it IS oracle-checkable: bin b counts
    * bytes with low nibble b (byte % 16), which DuckDB reads straight off
    * the hex encoding's second digit per byte.
    */
  val mediaFeatures: Q = (s, d) => {
    val f = extractFeatures(asMedia(tbl(s, d, "documents").where(col("doc_id") < 50)))
    f.select(col("media_id"),
      round(element_at(col("features"), 1), 6).as("bin0"),
      round(element_at(col("features"), 2), 6).as("bin1"))
      .orderBy(col("media_id"))
  }
  val mediaFeaturesSql: String =
    """WITH b AS (SELECT doc_id, hex(encode(text)) AS h,
      |                  octet_length(encode(text)) AS n
      |           FROM documents WHERE doc_id < 50)
      |SELECT doc_id AS media_id,
      |  round(len(list_filter(range(0, n), i ->
      |    strpos('0123456789ABCDEF', substr(h, 2*i+2, 1)) - 1 = 0))
      |    / CAST(greatest(n, 1) AS DOUBLE), 6) AS bin0,
      |  round(len(list_filter(range(0, n), i ->
      |    strpos('0123456789ABCDEF', substr(h, 2*i+2, 1)) - 1 = 1))
      |    / CAST(greatest(n, 1) AS DOUBLE), 6) AS bin1
      |FROM b ORDER BY media_id""".stripMargin

  /** Gate query: frame sampling through the real posexplode path. Frames
    * are byte slices of the payload, so DuckDB verifies them exactly off
    * the hex encoding: frame i of a payload with floor(n/4)-byte frames is
    * a substring of hex(payload). Verifies index, length, AND content.
    */
  val mediaFrames: Q = (s, d) => {
    val m = asMedia(tbl(s, d, "documents").where(col("doc_id") < 80))
    sampleFrames(m, 4)
      .select(col("media_id"), col("frame_idx").cast("long").as("frame_idx"),
        octet_length(col("frame")).cast("long").as("frame_len"),
        hex(col("frame")).as("frame_hex"))
      .orderBy(col("media_id"), col("frame_idx"))
  }
  val mediaFramesSql: String =
    """WITH b AS (SELECT doc_id, hex(encode(text)) AS h,
      |                  CAST(floor(octet_length(encode(text)) / 4) AS INT) AS fl
      |           FROM documents
      |           WHERE doc_id < 80 AND octet_length(encode(text)) >= 4)
      |SELECT doc_id AS media_id, i AS frame_idx,
      |       CAST(fl AS BIGINT) AS frame_len,
      |       substr(h, i * fl * 2 + 1, fl * 2) AS frame_hex
      |FROM b, (SELECT unnest(range(0, 4)) AS i)
      |ORDER BY media_id, frame_idx""".stripMargin

  // ----------------------------------------------- framed energy / VAD stub

  /** Per-payload frame energies: 8-bit-PCM-style interpretation of the
    * binary content (sample = byte − 128), non-overlapping `frame`-byte
    * windows, energy = mean squared sample. The voice-activity /
    * silence-trim front of every audio pipeline has exactly this shape:
    * binary in → per-frame scalar out, batched per partition; a real
    * decoder swaps the byte view for PCM floats, nothing else moves.
    */
  def frameEnergies(content: Array[Byte], frame: Int): Array[Double] = {
    val nf = content.length / frame
    Array.tabulate(nf) { f =>
      var s = 0L
      var i = f * frame
      while (i < (f + 1) * frame) {
        val v = (content(i) & 0xff) - 128
        s += v.toLong * v
        i += 1
      }
      s.toDouble / frame
    }
  }

  /** mm_energy — VAD-style active-frame detection through the REAL
    * distributed path: the [[frameEnergies]] kernel runs per partition
    * (mapPartitions — the Scala analogue of a batched Pandas UDF),
    * frames posexplode, and per-media stats collapse in one keyed
    * aggregation. Active = energy > 1500: on text payloads space-heavy
    * frames (space = 32 → sample² 9216) cross it, letter-dense frames
    * (~(−20)² ≈ 400) don't — so the gate exercises both branches.
    *
    * Exactness: each energy is (Σ v²)/32 with v² BIGINT — an exact
    * multiple of 1/32 in double, so frame sums/means are exact integer
    * arithmetic inside doubles (no rounding until the final 6 dp). The
    * oracle rebuilds every byte from the hex encoding (mediaFeatures'
    * trick) and replays the identical arithmetic.
    */
  val audioEnergy: Q = (s, d) => {
    val spark = s
    import spark.implicits._
    val media = asMedia(tbl(s, d, "documents").where(col("doc_id") < 60))
    val en = media.select(col("media_id"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, c) => (id, frameEnergies(c, 32)) })
      .toDF("media_id", "energies")
      .select(col("media_id"), posexplode(col("energies")).as(Seq("frame_idx", "e")))
    en.groupBy(col("media_id"))
      .agg(count(lit(1)).as("n_frames"),
        sum(when(col("e") > 1500.0, 1L).otherwise(0L)).as("n_active"),
        round(sum(col("e")) / count(lit(1)), 6).as("mean_energy"))
      .orderBy(col("media_id"))
  }
  val audioEnergySql: String = {
    // byte i (0-based) rebuilt from hex; duplicated because DuckDB
    // lambdas have no let-binding.
    def byteAt(off: String) =
      s"((strpos('0123456789ABCDEF', substr(h, 2*($off)+1, 1)) - 1) * 16 + " +
        s"strpos('0123456789ABCDEF', substr(h, 2*($off)+2, 1)) - 1 - 128)"
    s"""WITH b AS (SELECT doc_id, hex(encode(text)) AS h,
       |                  octet_length(encode(text)) AS n
       |           FROM documents WHERE doc_id < 60),
       |fr AS (SELECT doc_id, unnest(range(0, n // 32)) AS f, h FROM b),
       |en AS (SELECT doc_id, f,
       |              CAST(list_sum(list_transform(range(32*f, 32*f + 32), i ->
       |                CAST(${byteAt("i")} * ${byteAt("i")} AS BIGINT)))
       |                AS DOUBLE) / 32 AS e
       |       FROM fr)
       |SELECT doc_id AS media_id, count(*) AS n_frames,
       |       CAST(sum(CASE WHEN e > 1500 THEN 1 ELSE 0 END) AS BIGINT) AS n_active,
       |       round(sum(e) / count(*), 6) AS mean_energy
       |FROM en GROUP BY doc_id ORDER BY media_id""".stripMargin
  }

  // ------------------------------------------------ scene-change detection

  /** mm_scene — shot-boundary detection over the framed payload: a CUT is
    * a frame whose energy jumps by more than 3000 against its
    * predecessor (|Δe| on [[frameEnergies]]' exact 1/32-rational values)
    * — the standard first pass of video segmentation (real detectors
    * swap energy for histogram/SSIM deltas; the lag-compare shape is
    * identical). Per media: frame count, cut count, and the first cut
    * index (−1 when none — kept NULL-free for engine-bridge parity).
    * One per-media window over the exploded frames.
    */
  val sceneChange: Q = (s, d) => {
    val spark = s
    import spark.implicits._
    val media = asMedia(tbl(s, d, "documents").where(col("doc_id") < 60))
    val en = media.select(col("media_id"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, c) => (id, frameEnergies(c, 32)) })
      .toDF("media_id", "energies")
      .select(col("media_id"), posexplode(col("energies")).as(Seq("f", "e")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("media_id")).orderBy(col("f"))
    en.withColumn("cut",
        (abs(col("e") - lag(col("e"), 1).over(w)) > 3000.0).cast("long"))
      .groupBy(col("media_id"))
      .agg(count(lit(1)).as("n_frames"),
        sum(coalesce(col("cut"), lit(0L))).as("n_cuts"),
        coalesce(min(when(col("cut") === 1L, col("f"))), lit(-1))
          .cast("long").as("first_cut"))
      .orderBy(col("media_id"))
  }
  val sceneChangeSql: String = {
    def byteAt(off: String) =
      s"((strpos('0123456789ABCDEF', substr(h, 2*($off)+1, 1)) - 1) * 16 + " +
        s"strpos('0123456789ABCDEF', substr(h, 2*($off)+2, 1)) - 1 - 128)"
    s"""WITH b AS (SELECT doc_id, hex(encode(text)) AS h,
       |                  octet_length(encode(text)) AS n
       |           FROM documents WHERE doc_id < 60),
       |fr AS (SELECT doc_id, unnest(range(0, n // 32)) AS f, h FROM b),
       |en AS (SELECT doc_id, f,
       |              CAST(list_sum(list_transform(range(32*f, 32*f + 32), i ->
       |                CAST(${byteAt("i")} * ${byteAt("i")} AS BIGINT)))
       |                AS DOUBLE) / 32 AS e
       |       FROM fr),
       |cuts AS (
       |  SELECT doc_id, f,
       |         CASE WHEN abs(e - lag(e) OVER (PARTITION BY doc_id ORDER BY f)) > 3000
       |              THEN 1 ELSE 0 END AS cut
       |  FROM en)
       |SELECT doc_id AS media_id, count(*) AS n_frames,
       |       CAST(sum(cut) AS BIGINT) AS n_cuts,
       |       CAST(coalesce(min(CASE WHEN cut = 1 THEN f END), -1) AS BIGINT)
       |         AS first_cut
       |FROM cuts GROUP BY doc_id ORDER BY media_id""".stripMargin
  }

  // ------------------------------------------------- perceptual-hash dedup

  /** mm_phash — perceptual-hash near-duplicate detection over the media
    * view: the image-dedup step of a multimodal corpus pipeline (pHash/
    * aHash family), with the DECODE stubbed per this file's discipline
    * and everything downstream of it real. The stub "luma plane" samples
    * 64 evenly-strided bytes of the payload (a real decoder resizes to
    * 8×8 grayscale — same fixed-length output contract); the average-hash
    * rule then sets bit i iff pixel_i > mean, packed into two 32-bit
    * words. Near-identical payloads (the corpus's planted near-dups)
    * differ in few sampled bytes ⇒ small Hamming distance.
    *
    * The SCALE part is candidate generation: comparing all pairs is
    * O(n²), so the 64-bit hash splits into four 16-bit BANDS and pairs
    * are generated by equi-join on (band_idx, band_value) — the exact
    * multi-index trick of Manku et al. (WWW'07) for SimHash at web
    * scale: any two hashes within Hamming distance 3 share a band by
    * pigeonhole (GUARANTEED recall at d ≤ 3; the d ≤ 10 tail is
    * best-effort, as in production). Bands shuffle on (idx, value) —
    * co-partitioned, skew-bounded by band-bucket population; the
    * verification step is O(candidates), each a 2×xor+popcount.
    *
    * Exactness: pixels are BIGINT codepoints; the mean test is the
    * integer compare px·64 > Σpx (no float division anywhere); the hash
    * words, bands, xor and bit_count are all 64-bit integer ops —
    * bit-identical in DuckDB.
    */
  val phash: Q = (s, d) => {
    val base = tbl(s, d, "documents")
      .where(length(col("text")) >= 64)
      .select(col("doc_id"), col("text"),
        expr("length(text) div 64").cast("long").as("stride"))
    val px = base
      .select(col("doc_id"), explode(sequence(lit(0L), lit(63L))).as("i"),
        ascii(expr("substring(text, CAST(1 + i * stride AS INT), 1)"))
          .cast("long").as("px"))
    val hashes = px
      .withColumn("spx", sum(col("px")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))))
      .withColumn("bit", (col("px") * 64L > col("spx")).cast("long"))
      .groupBy(col("doc_id")).agg(
        sum(when(col("i") < 32, col("bit") * expr("shiftleft(CAST(1 AS BIGINT), CAST(i AS INT))"))
          .otherwise(0L)).as("hi"),
        sum(when(col("i") >= 32, col("bit") * expr("shiftleft(CAST(1 AS BIGINT), CAST(i - 32 AS INT))"))
          .otherwise(0L)).as("lo"))
    val bands = hashes.select(col("doc_id"), col("hi"), col("lo"),
      expr("""stack(4, 0, hi % 65536, 1, hi div 65536,
             |         2, lo % 65536, 3, lo div 65536) AS (band_idx, band_val)""".stripMargin))
    val cand = bands.select(col("band_idx"), col("band_val"),
        col("doc_id").as("a"), col("hi").as("hi_a"), col("lo").as("lo_a"))
      .join(bands.select(col("band_idx"), col("band_val"),
        col("doc_id").as("b"), col("hi").as("hi_b"), col("lo").as("lo_b")),
        Seq("band_idx", "band_val"))
      .where(col("a") < col("b"))
      .select(col("a"), col("b"), col("hi_a"), col("lo_a"), col("hi_b"), col("lo_b"))
      .distinct()
    cand
      .select(col("a"), col("b"),
        (bit_count(expr("hi_a ^ hi_b")) + bit_count(expr("lo_a ^ lo_b")))
          .cast("long").as("hamming"))
      .where(col("hamming") <= 10)
      .orderBy(col("a"), col("b"))
  }
  val phashSql: String =
    """WITH base AS (
      |  SELECT doc_id, text, CAST(len(text) // 64 AS BIGINT) AS stride
      |  FROM documents WHERE len(text) >= 64),
      |px AS (
      |  SELECT doc_id, i,
      |         CAST(ascii(substr(text, CAST(1 + i * stride AS INT), 1)) AS BIGINT) AS px
      |  FROM base, (SELECT unnest(range(0, 64)) AS i)),
      |pm AS (
      |  SELECT doc_id, i, px, sum(px) OVER (PARTITION BY doc_id) AS spx FROM px),
      |hs AS (
      |  SELECT doc_id,
      |         CAST(sum(CASE WHEN i < 32 AND px * 64 > spx
      |                       THEN CAST(1 AS BIGINT) << CAST(i AS INT) ELSE 0 END) AS BIGINT) AS hi,
      |         CAST(sum(CASE WHEN i >= 32 AND px * 64 > spx
      |                       THEN CAST(1 AS BIGINT) << CAST(i - 32 AS INT) ELSE 0 END) AS BIGINT) AS lo
      |  FROM pm GROUP BY doc_id),
      |bands AS (
      |  SELECT doc_id, hi, lo, band_idx,
      |         CASE band_idx WHEN 0 THEN hi % 65536 WHEN 1 THEN hi // 65536
      |                       WHEN 2 THEN lo % 65536 ELSE lo // 65536 END AS band_val
      |  FROM hs, (SELECT unnest(range(0, 4)) AS band_idx)),
      |cand AS (
      |  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b,
      |         x.hi AS hi_a, x.lo AS lo_a, y.hi AS hi_b, y.lo AS lo_b
      |  FROM bands x JOIN bands y
      |    ON x.band_idx = y.band_idx AND x.band_val = y.band_val
      |   AND x.doc_id < y.doc_id)
      |SELECT a, b,
      |       CAST(bit_count(xor(hi_a, hi_b)) + bit_count(xor(lo_a, lo_b)) AS BIGINT) AS hamming
      |FROM cand
      |WHERE bit_count(xor(hi_a, hi_b)) + bit_count(xor(lo_a, lo_b)) <= 10
      |ORDER BY a, b""".stripMargin

  // --------------------------------------------------- REAL image decode

  /** Synthetic-image dimensions: 24×16 so the 8×8 hash grid gets exact
    * 3×2-pixel blocks (no fractional block edges → pure integer block
    * sums on both engines).
    */
  val ImgW = 24
  val ImgH = 16

  // ImageIO's default stream cache writes temp files per decode — pure
  // overhead for in-memory byte arrays on executors.
  javax.imageio.ImageIO.setUseCache(false)

  /** Channel values of the synthetic test image for `docId` at (x, y):
    * cheap distinct linear congruences mod 256. This formula exists on
    * BOTH engines — Spark uses it only to PAINT the PNG; the features
    * come from decoded pixels, while DuckDB computes features from the
    * formula directly. PNG is lossless, so the gates agree iff the real
    * encode→decode roundtrip is pixel-exact.
    */
  def synthRgb(docId: Long, x: Int, y: Int): (Int, Int, Int) = (
    ((7 * docId + 3 * x + 5 * y) % 256).toInt,
    ((11 * docId + 13 * x + y) % 256).toInt,
    ((3 * docId + x + 7 * y) % 256).toInt)

  /** Paint + PNG-encode the synthetic image for `docId` (real
    * `javax.imageio` encoder, runs on executors).
    */
  def synthPng(docId: Long): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      ImgW, ImgH, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < ImgH) {
      var x = 0
      while (x < ImgW) {
        val (r, g, b) = synthRgb(docId, x, y)
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** REAL image decode: `javax.imageio` (PNG/JPEG/BMP/GIF ship with the
    * JDK). Returns None for undecodable bytes — the quarantine path, so
    * a corrupt blob degrades to a dropped row, never a task failure.
    */
  def decodeImage(bytes: Array[Byte]): Option[java.awt.image.BufferedImage] =
    try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))
    catch { case _: Exception => None }

  /** Media view of synthetic payloads (doc_id < n, painted by `synth`)
    * plus 5 deliberately UNDECODABLE payloads (raw text bytes, ids
    * offset by 1 000 000) — THE planted-corruption contract every decode
    * gate shares: downstream must pass the synthetic media through and
    * quarantine the rest.
    */
  def synthMedia(s: SparkSession, d: String, n: Int)
                (synth: Long => Array[Byte]): DataFrame = {
    val spark = s
    import spark.implicits._
    val ids = tbl(s, d, "documents").where(col("doc_id") < n)
      .select(col("doc_id")).as[Long]
    val media = ids.mapPartitions(_.map(id => (id, synth(id))))
      .toDF("media_id", "content")
    val corrupt = tbl(s, d, "documents").where(col("doc_id") < 5)
      .select((col("doc_id") + 1000000L).as("media_id"),
        encode(col("text"), "UTF-8").as("content"))
    media.unionByName(corrupt)
  }

  def synthImageMedia(s: SparkSession, d: String, n: Int): DataFrame =
    synthMedia(s, d, n)(synthPng)

  /** mm_decode — REAL decode → per-channel stats, through the batched
    * per-partition path (the Scala analogue of `mapInPandas`): PNG bytes
    * in, one small feature row out; undecodable payloads drop (the 5
    * planted corrupt rows prove the quarantine branch under the oracle —
    * they appear in the input and not the output).
    *
    * Exactness: decoded 8-bit channels are integers; sums/mins/maxes are
    * integer arithmetic. The oracle never sees a PNG — it replays
    * [[synthRgb]] directly — so equality holds iff ImageIO's
    * encode→decode roundtrip reproduced every pixel.
    */
  val imageDecode: Q = (s, d) => {
    val spark = s
    import spark.implicits._
    val feats = synthImageMedia(s, d, 40)
      .select(col("media_id"), col("content")).as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        decodeImage(bytes).map { img =>
          val (w, h) = (img.getWidth, img.getHeight)
          var (rs, gs, bs) = (0L, 0L, 0L)
          var (rmin, rmax) = (255, 0)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val p = img.getRGB(x, y)
              val r = (p >> 16) & 0xff
              rs += r; gs += (p >> 8) & 0xff; bs += p & 0xff
              if (r < rmin) rmin = r
              if (r > rmax) rmax = r
              x += 1
            }
            y += 1
          }
          (id, w.toLong, h.toLong, rs, gs, bs, rmin.toLong, rmax.toLong)
        }
      })
      .toDF("media_id", "width", "height", "r_sum", "g_sum", "b_sum",
        "r_min", "r_max")
    feats.orderBy(col("media_id"))
  }
  val imageDecodeSql: String =
    s"""WITH px AS (
       |  SELECT doc_id, (7*doc_id + 3*x + 5*y) % 256 AS r,
       |         (11*doc_id + 13*x + y) % 256 AS g,
       |         (3*doc_id + x + 7*y) % 256 AS b
       |  FROM (SELECT doc_id FROM documents WHERE doc_id < 40),
       |       (SELECT unnest(range(0, $ImgW)) AS x),
       |       (SELECT unnest(range(0, $ImgH)) AS y))
       |SELECT doc_id AS media_id,
       |       CAST($ImgW AS BIGINT) AS width, CAST($ImgH AS BIGINT) AS height,
       |       CAST(sum(r) AS BIGINT) AS r_sum, CAST(sum(g) AS BIGINT) AS g_sum,
       |       CAST(sum(b) AS BIGINT) AS b_sum,
       |       CAST(min(r) AS BIGINT) AS r_min, CAST(max(r) AS BIGINT) AS r_max
       |FROM px GROUP BY doc_id ORDER BY media_id""".stripMargin

  /** mm_phash_img — TRUE perceptual average-hash over REAL decoded
    * pixels: decode PNG → integer luma (77r+150g+29b, the Rec.601
    * weights scaled ×256, division deferred so everything stays exact) →
    * 8×8 block-sum downscale (exact 3×2 blocks) → bit i set iff
    * block_i·64 > Σblocks (integer compare, no float mean) → packed into
    * two 32-bit words. This is mm_phash with the stub "sampled bytes"
    * luma plane replaced by a real decoded image; banding/Hamming
    * candidate generation at corpus scale is identical to mm_phash's and
    * not re-tested here.
    */
  val imagePhash: Q = (s, d) => {
    val spark = s
    import spark.implicits._
    synthImageMedia(s, d, 40)
      .select(col("media_id"), col("content")).as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        decodeImage(bytes).map { img =>
          val blocks = new Array[Long](64)
          var y = 0
          while (y < ImgH) {
            var x = 0
            while (x < ImgW) {
              val p = img.getRGB(x, y)
              val luma = 77L * ((p >> 16) & 0xff) + 150L * ((p >> 8) & 0xff) +
                29L * (p & 0xff)
              blocks((y / 2) * 8 + (x / 3)) += luma
              x += 1
            }
            y += 1
          }
          val total = blocks.sum
          var (hi, lo) = (0L, 0L)
          var i = 0
          while (i < 64) {
            if (blocks(i) * 64 > total) {
              if (i < 32) lo |= 1L << i else hi |= 1L << (i - 32)
            }
            i += 1
          }
          (id, hi, lo)
        }
      })
      .toDF("media_id", "hash_hi", "hash_lo")
      .orderBy(col("media_id"))
  }
  val imagePhashSql: String =
    s"""WITH lum AS (
       |  SELECT doc_id, (y // 2) * 8 + (x // 3) AS i,
       |         77*((7*doc_id + 3*x + 5*y) % 256)
       |         + 150*((11*doc_id + 13*x + y) % 256)
       |         + 29*((3*doc_id + x + 7*y) % 256) AS luma
       |  FROM (SELECT doc_id FROM documents WHERE doc_id < 40),
       |       (SELECT unnest(range(0, $ImgW)) AS x),
       |       (SELECT unnest(range(0, $ImgH)) AS y)),
       |bl AS (SELECT doc_id, i, CAST(sum(luma) AS BIGINT) AS bs
       |       FROM lum GROUP BY doc_id, i),
       |tot AS (SELECT doc_id, i, bs, sum(bs) OVER (PARTITION BY doc_id) AS ts
       |        FROM bl)
       |SELECT doc_id AS media_id,
       |  CAST(sum(CASE WHEN i >= 32 AND bs*64 > ts
       |                THEN CAST(1 AS BIGINT) << CAST(i - 32 AS INT)
       |                ELSE 0 END) AS BIGINT) AS hash_hi,
       |  CAST(sum(CASE WHEN i < 32 AND bs*64 > ts
       |                THEN CAST(1 AS BIGINT) << CAST(i AS INT)
       |                ELSE 0 END) AS BIGINT) AS hash_lo
       |FROM tot GROUP BY doc_id ORDER BY media_id""".stripMargin

  // ----------------------------------------------------- REAL audio decode

  /** Synthetic-audio shape: 16-bit signed PCM mono, 8 kHz, 256 samples. */
  val WavN = 256

  /** Sample i of the synthetic test clip for `docId`: a full-range
    * integer LCG-ish formula both engines can compute exactly.
    */
  def synthSample(docId: Long, i: Int): Int =
    (((31 * docId + 257 * i) % 65536) - 32768).toInt

  /** Paint + WAV-encode the synthetic clip (real `javax.sound.sampled`
    * encoder — the JDK ships the WAV/PCM codec; compressed audio would
    * need external codecs and stays stubbed).
    */
  def synthWav(docId: Long): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val pcm = new Array[Byte](WavN * 2)
    var i = 0
    while (i < WavN) {
      val s = synthSample(docId, i)
      pcm(2 * i) = (s & 0xff).toByte          // little-endian
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, WavN.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** REAL audio decode: WAV container → signed 16-bit samples. None for
    * undecodable bytes (quarantine, like [[decodeImage]]).
    */
  def decodeWav(bytes: Array[Byte]): Option[Array[Int]] =
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val fmt = ais.getFormat
      // encoding must be checked too: an unsigned-PCM or float WAV would
      // otherwise be silently reassembled as signed two's-complement
      // (every sample off by 32768) instead of quarantined
      if (fmt.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED ||
          fmt.getSampleSizeInBits != 16 || fmt.getChannels != 1) None
      else {
        val raw = ais.readAllBytes()
        val n = raw.length / 2
        val out = new Array[Int](n)
        var i = 0
        while (i < n) {
          out(i) =
            if (fmt.isBigEndian) (raw(2 * i) << 8) | (raw(2 * i + 1) & 0xff)
            else (raw(2 * i + 1) << 8) | (raw(2 * i) & 0xff)
          i += 1
        }
        Some(out)
      }
    } catch { case _: Exception => None }

  /** mm_wav — REAL WAV decode → per-clip sample stats through the batched
    * partition path; 5 planted corrupt payloads must quarantine. PCM is
    * lossless integers, so the oracle replays [[synthSample]] exactly —
    * agreement iff the real encode→decode roundtrip is sample-exact.
    * Stats are integer sums (sum of squares ≤ 256·2³⁰ — BIGINT-exact).
    */
  val wavDecode: Q = (s, d) => {
    val spark = s
    import spark.implicits._
    synthMedia(s, d, 40)(synthWav)
      .select(col("media_id"), col("content")).as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        decodeWav(bytes).map { samples =>
          var (sm, sq) = (0L, 0L)
          var (mn, mx) = (Int.MaxValue, Int.MinValue)
          samples.foreach { v =>
            sm += v; sq += v.toLong * v
            if (v < mn) mn = v
            if (v > mx) mx = v
          }
          (id, samples.length.toLong, sm, sq, mn.toLong, mx.toLong)
        }
      })
      .toDF("media_id", "n_samples", "s_sum", "s_sq", "s_min", "s_max")
      .orderBy(col("media_id"))
  }
  val wavDecodeSql: String =
    s"""WITH sm AS (
       |  SELECT doc_id, ((31*doc_id + 257*i) % 65536) - 32768 AS v
       |  FROM (SELECT doc_id FROM documents WHERE doc_id < 40),
       |       (SELECT unnest(range(0, $WavN)) AS i))
       |SELECT doc_id AS media_id, CAST($WavN AS BIGINT) AS n_samples,
       |       CAST(sum(v) AS BIGINT) AS s_sum, CAST(sum(v*v) AS BIGINT) AS s_sq,
       |       CAST(min(v) AS BIGINT) AS s_min, CAST(max(v) AS BIGINT) AS s_max
       |FROM sm GROUP BY doc_id ORDER BY media_id""".stripMargin

  // --------------------------------- REAL compressed audio (G.711 µ-law)

  /** Synthetic µ-law clip length. 13 is coprime to 256, so with 256
    * samples every one of the 256 µ-law codes appears exactly once per
    * clip — full codec-table coverage in every row.
    */
  val UlawN = 256

  /** µ-law code byte i of the synthetic clip for `docId` — shared with
    * the DuckDB oracle.
    */
  def synthUlawByte(docId: Long, i: Int): Int = ((docId * 7 + i * 13) % 256).toInt

  /** G.711 µ-law expansion of one code byte to a 16-bit PCM sample —
    * the public standard's expansion (complement, 3-bit exponent,
    * 4-bit mantissa, bias 132), at the 16-bit scaling (±32124) the JDK
    * codec uses. Written here independently from the formula (not a
    * table), and cross-checked against `javax.sound.sampled`'s actual
    * converter output in ImageCodecSpec: the mm_ulaw gate then holds
    * iff JDK-decode ≡ this formula ≡ the oracle's SQL replay of it.
    */
  def ulawExpand(code: Int): Int = {
    val u = (~code) & 0xff
    val t = (((u & 0x0f) << 3) + 132) << ((u >> 4) & 7)
    if ((u & 0x80) != 0) 132 - t else t - 132
  }

  /** G.711 A-law expansion (even-bit inversion 0x55, segment/mantissa,
    * JDK 16-bit scaling) — same cross-check discipline as [[ulawExpand]].
    */
  def alawExpand(code: Int): Int = {
    val a = code ^ 0x55
    val seg = (a >> 4) & 7
    val base = ((a & 0x0f) << 4) + 8
    val mag = if (seg == 0) base else (base + 0x100) << (seg - 1)
    if ((a & 0x80) != 0) mag else -mag
  }

  /** Paint + encode the synthetic µ-law clip as a real µ-law WAV
    * (format code 7) via the JDK's WAVE writer — a genuinely COMPRESSED
    * (companded, lossy 8-bit) audio payload, unlike mm_wav's linear PCM.
    */
  def synthUlaw(docId: Long): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(
      javax.sound.sampled.AudioFormat.Encoding.ULAW, 8000f, 8, 1, 1, 8000f, false)
    val raw = Array.tabulate(UlawN)(i => synthUlawByte(docId, i).toByte)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(raw), fmt, UlawN.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** REAL compressed-audio decode: µ-law or A-law WAV → signed 16-bit
    * samples through `AudioSystem`'s format-conversion codec (the JDK
    * ships G.711 both ways; mp3/aac would need external codecs and stay
    * stubbed). None quarantines undecodable bytes, like [[decodeWav]].
    */
  def decodeCompandedWav(bytes: Array[Byte]): Option[Array[Int]] =
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val src = ais.getFormat
      val companded =
        src.getEncoding == javax.sound.sampled.AudioFormat.Encoding.ULAW ||
          src.getEncoding == javax.sound.sampled.AudioFormat.Encoding.ALAW
      if (!companded || src.getChannels != 1) None
      else {
        val pcmFmt = new javax.sound.sampled.AudioFormat(
          javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
          src.getSampleRate, 16, 1, 2, src.getSampleRate, false)
        val pcm = javax.sound.sampled.AudioSystem.getAudioInputStream(pcmFmt, ais)
        val raw = pcm.readAllBytes()
        val n = raw.length / 2
        val out = new Array[Int](n)
        var i = 0
        while (i < n) {
          out(i) = (raw(2 * i + 1) << 8) | (raw(2 * i) & 0xff)
          i += 1
        }
        Some(out)
      }
    } catch { case _: Exception => None }

  /** mm_ulaw — REAL compressed-audio decode under the driver oracle:
    * µ-law WAVs through the JDK's ULAW→PCM converter → per-clip sample
    * stats, 5 planted corrupt payloads quarantined. The oracle replays
    * [[synthUlawByte]] + [[ulawExpand]] in SQL integer arithmetic, so
    * agreement is sample-exact across the real companded codec.
    */
  val ulawDecode: Q = (s, d) => {
    val spark = s
    import spark.implicits._
    synthMedia(s, d, 40)(synthUlaw)
      .select(col("media_id"), col("content")).as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        decodeCompandedWav(bytes).map { samples =>
          var (sm, sq) = (0L, 0L)
          var (mn, mx) = (Int.MaxValue, Int.MinValue)
          samples.foreach { v =>
            sm += v; sq += v.toLong * v
            if (v < mn) mn = v
            if (v > mx) mx = v
          }
          (id, samples.length.toLong, sm, sq, mn.toLong, mx.toLong)
        }
      })
      .toDF("media_id", "n_samples", "s_sum", "s_sq", "s_min", "s_max")
      .orderBy(col("media_id"))
  }
  val ulawDecodeSql: String =
    s"""WITH code AS (
       |  SELECT doc_id, (doc_id*7 + i*13) % 256 AS b
       |  FROM (SELECT doc_id FROM documents WHERE doc_id < 40),
       |       (SELECT unnest(range(0, $UlawN)) AS i)),
       |dec AS (
       |  SELECT doc_id,
       |    CASE WHEN ((255 - b) & 128) != 0
       |         THEN 132 - ((((255 - b) & 15) * 8 + 132) * (1 << (((255 - b) >> 4) & 7)))
       |         ELSE ((((255 - b) & 15) * 8 + 132) * (1 << (((255 - b) >> 4) & 7))) - 132
       |    END AS v
       |  FROM code)
       |SELECT doc_id AS media_id, CAST($UlawN AS BIGINT) AS n_samples,
       |       CAST(sum(v) AS BIGINT) AS s_sum, CAST(sum(v*v) AS BIGINT) AS s_sq,
       |       CAST(min(v) AS BIGINT) AS s_min, CAST(max(v) AS BIGINT) AS s_max
       |FROM dec GROUP BY doc_id ORDER BY media_id""".stripMargin

  /** A-law code byte i of the synthetic clip for `docId` — a different
    * stripe than [[synthUlawByte]] so the two companded gates can never
    * mask each other; 13 coprime to 256 again covers all 256 codes.
    */
  def synthAlawByte(docId: Long, i: Int): Int = ((docId * 11 + i * 13) % 256).toInt

  /** Paint + encode the synthetic A-law clip as a real A-law WAV (format
    * code 6) via the JDK's WAVE writer — [[synthUlaw]]'s sibling.
    */
  def synthAlaw(docId: Long): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(
      javax.sound.sampled.AudioFormat.Encoding.ALAW, 8000f, 8, 1, 1, 8000f, false)
    val raw = Array.tabulate(UlawN)(i => synthAlawByte(docId, i).toByte)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(raw), fmt, UlawN.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** mm_alaw — the A-law leg of REAL compressed-audio decode under the
    * driver oracle (r14 verdict item 6: [[alawExpand]] was implemented
    * and JDK-cross-checked in ImageCodecSpec but only µ-law had a gate).
    * Same contract as mm_ulaw: A-law WAVs through the JDK's ALAW→PCM
    * converter → per-clip sample stats, 5 planted corrupt payloads
    * quarantined; the oracle replays [[synthAlawByte]] + [[alawExpand]]
    * in SQL integer arithmetic, so agreement is sample-exact across the
    * real companded codec.
    */
  val alawDecode: Q = (s, d) => {
    val spark = s
    import spark.implicits._
    synthMedia(s, d, 40)(synthAlaw)
      .select(col("media_id"), col("content")).as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        decodeCompandedWav(bytes).map { samples =>
          var (sm, sq) = (0L, 0L)
          var (mn, mx) = (Int.MaxValue, Int.MinValue)
          samples.foreach { v =>
            sm += v; sq += v.toLong * v
            if (v < mn) mn = v
            if (v > mx) mx = v
          }
          (id, samples.length.toLong, sm, sq, mn.toLong, mx.toLong)
        }
      })
      .toDF("media_id", "n_samples", "s_sum", "s_sq", "s_min", "s_max")
      .orderBy(col("media_id"))
  }
  val alawDecodeSql: String =
    s"""WITH code AS (
       |  SELECT doc_id, (doc_id*11 + i*13) % 256 AS b
       |  FROM (SELECT doc_id FROM documents WHERE doc_id < 40),
       |       (SELECT unnest(range(0, $UlawN)) AS i)),
       |dec AS (
       |  SELECT doc_id,
       |    CASE WHEN (xor(b, 85) & 128) != 0
       |         THEN CASE WHEN ((xor(b, 85) >> 4) & 7) = 0
       |                   THEN (xor(b, 85) & 15) * 16 + 8
       |                   ELSE ((xor(b, 85) & 15) * 16 + 8 + 256)
       |                        * (1 << (((xor(b, 85) >> 4) & 7) - 1)) END
       |         ELSE -(CASE WHEN ((xor(b, 85) >> 4) & 7) = 0
       |                     THEN (xor(b, 85) & 15) * 16 + 8
       |                     ELSE ((xor(b, 85) & 15) * 16 + 8 + 256)
       |                          * (1 << (((xor(b, 85) >> 4) & 7) - 1)) END)
       |    END AS v
       |  FROM code)
       |SELECT doc_id AS media_id, CAST($UlawN AS BIGINT) AS n_samples,
       |       CAST(sum(v) AS BIGINT) AS s_sum, CAST(sum(v*v) AS BIGINT) AS s_sq,
       |       CAST(min(v) AS BIGINT) AS s_min, CAST(max(v) AS BIGINT) AS s_max
       |FROM dec GROUP BY doc_id ORDER BY media_id""".stripMargin

  // ------------------------------------------- REAL multi-frame decode (GIF)

  /** Synthetic-clip shape: 4 frames of 16×12, pixels drawn from a fixed
    * 16-color palette (≤256 colors ⇒ the JDK GIF writer encodes
    * losslessly — verified pixel-exact in ImageCodecSpec).
    */
  val GifW = 16
  val GifH = 12
  val GifF = 4

  /** Palette color k (0..15) and the frame-pixel formula — shared with
    * the DuckDB oracle, which replays both in integer arithmetic.
    */
  def gifPalette(k: Int): Int =
    ((k * 17) << 16) | (((15 - k) * 17) << 8) | ((k * 7 % 16) * 17)
  def gifIndex(docId: Long, f: Int, x: Int, y: Int): Int =
    ((docId * 3 + f * 5 + x + 2 * y) % 16).toInt

  /** Paint + encode an ANIMATED GIF (real multi-frame container via the
    * JDK's `writeToSequence` — the stand-in for video frame extraction:
    * same container-in → per-frame-out contract, real codec).
    */
  def synthGif(docId: Long): Array[Byte] = {
    val w = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    try {
      w.setOutput(ios)
      w.prepareWriteSequence(null)
      var f = 0
      while (f < GifF) {
        val img = new java.awt.image.BufferedImage(
          GifW, GifH, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < GifH) {
          var x = 0
          while (x < GifW) {
            img.setRGB(x, y, gifPalette(gifIndex(docId, f, x, y)))
            x += 1
          }
          y += 1
        }
        w.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
        f += 1
      }
      w.endWriteSequence()
    } finally { ios.close(); w.dispose() }
    bos.toByteArray
  }

  /** REAL frame extraction: decode every frame of a GIF container.
    * None for undecodable bytes (quarantine).
    */
  def decodeGifFrames(bytes: Array[Byte]): Option[Seq[java.awt.image.BufferedImage]] =
    try {
      val it = javax.imageio.ImageIO.getImageReadersByFormatName("gif")
      if (!it.hasNext) return None
      val r = it.next()
      try {
        r.setInput(javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(bytes)))
        val n = r.getNumImages(true)
        if (n <= 0) None else Some((0 until n).map(r.read))
      } finally r.dispose()
    } catch { case _: Exception => None }

  /** mm_gif_frames — REAL multi-frame decode through the batched
    * partition path: container bytes in, one row per DECODED frame out
    * (frame index, pixel count, integer RGB sum), 5 planted corrupt
    * payloads quarantined. The oracle replays the palette formula —
    * agreement iff the real encode→decode roundtrip reproduced every
    * frame's every pixel.
    */
  val gifFrames: Q = (s, d) => {
    val spark = s
    import spark.implicits._
    synthMedia(s, d, 40)(synthGif)
      .select(col("media_id"), col("content")).as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        decodeGifFrames(bytes).toSeq.flatMap(_.zipWithIndex.map { case (img, f) =>
          var rgb = 0L
          var y = 0
          while (y < img.getHeight) {
            var x = 0
            while (x < img.getWidth) {
              val p = img.getRGB(x, y)
              rgb += ((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)
              x += 1
            }
            y += 1
          }
          (id, f.toLong, (img.getWidth * img.getHeight).toLong, rgb)
        })
      })
      .toDF("media_id", "frame_idx", "n_px", "rgb_sum")
      .orderBy(col("media_id"), col("frame_idx"))
  }
  val gifFramesSql: String =
    s"""WITH px AS (
       |  SELECT doc_id, f,
       |         (doc_id*3 + f*5 + x + 2*y) % 16 AS k
       |  FROM (SELECT doc_id FROM documents WHERE doc_id < 40),
       |       (SELECT unnest(range(0, $GifF)) AS f),
       |       (SELECT unnest(range(0, $GifW)) AS x),
       |       (SELECT unnest(range(0, $GifH)) AS y))
       |SELECT doc_id AS media_id, f AS frame_idx,
       |       CAST(${GifW * GifH} AS BIGINT) AS n_px,
       |       CAST(sum(k*17 + (15-k)*17 + (k*7 % 16)*17) AS BIGINT) AS rgb_sum
       |FROM px GROUP BY doc_id, f ORDER BY media_id, frame_idx""".stripMargin

  val queries: Map[String, Q] = Map(
    "mm_media_meta" -> mediaMeta,
    "mm_features"   -> mediaFeatures,
    "mm_frames"     -> mediaFrames,
    "mm_phash"      -> phash,
    "mm_energy"     -> audioEnergy,
    "mm_scene"      -> sceneChange,
    "mm_decode"     -> imageDecode,
    "mm_phash_img"  -> imagePhash,
    "mm_wav"        -> wavDecode,
    "mm_ulaw"       -> ulawDecode,
    "mm_alaw"       -> alawDecode,
    "mm_gif_frames" -> gifFrames,
  )

  val oracles: Map[String, String] = Map(
    "mm_media_meta" -> mediaMetaSql,
    "mm_features"   -> mediaFeaturesSql,
    "mm_frames"     -> mediaFramesSql,
    "mm_phash"      -> phashSql,
    "mm_energy"     -> audioEnergySql,
    "mm_scene"      -> sceneChangeSql,
    "mm_decode"     -> imageDecodeSql,
    "mm_phash_img"  -> imagePhashSql,
    "mm_wav"        -> wavDecodeSql,
    "mm_ulaw"       -> ulawDecodeSql,
    "mm_alaw"       -> alawDecodeSql,
    "mm_gif_frames" -> gifFramesSql,
  )
}
