package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** Multimodal column handling (SURVEY §2.2 row 32): media payloads are
  * opaque `binary` columns plus a typed metadata struct; decode /
  * feature-extraction runs per-partition in batches.
  *
  * The decode step is a clearly marked STUB (no image/audio codecs in
  * this container): it derives deterministic fake features from the
  * payload bytes. Everything around it — the schema, the binary
  * column, the partition-batched execution shape, the feature struct
  * — is the real plumbing a codec-backed decoder would drop into.
  *
  * Scale notes: payloads never shuffle (all feature extraction is
  * map-side); metadata-only queries prune the binary column at the
  * parquet reader, so a 100 TB media table scans only its (tiny)
  * metadata columns.
  */
object Multimodal {

  case class MediaFeatures(width: Long, height: Long, nFrames: Long)
  case class MediaRecord(doc_id: Long, payload: Array[Byte])
  case class DecodedRecord(doc_id: Long, n_bytes: Long, features: MediaFeatures)

  /** View the documents table as a media table: payload = utf-8 bytes
    * of `text` standing in for an image/audio blob.
    */
  def asMediaTable(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[MediaRecord]
  }

  /** STUB decode: deterministic fake features from payload size.
    * A real implementation would decode the codec here (per partition,
    * batched); the signature and execution shape are what matter.
    */
  def decodeStub(payload: Array[Byte], docId: Long): MediaFeatures = {
    val n = payload.length.toLong
    MediaFeatures(32 + n % 640, 32 + (n * 7) % 480, 1 + docId % 30)
  }

  /** Partition-batched decode — the `mapPartitions` execution shape a
    * codec-backed decoder needs (amortized per-partition init, e.g.
    * loading a decoder library once per task, not per row).
    */
  def decodeAll(media: Dataset[MediaRecord]): Dataset[DecodedRecord] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // real decoder init would happen here, once per partition
      it.map(r => DecodedRecord(r.doc_id, r.payload.length.toLong,
        decodeStub(r.payload, r.doc_id)))
    }
  }

  /** REAL image features, decoded with the JDK's own codec stack
    * (`javax.imageio` — PNG/JPEG/GIF/BMP, no external libraries).
    * `mean_luma_x1000` is the ITU-R BT.601 luma (299·R + 587·G +
    * 114·B) summed EXACTLY over all pixels in integer arithmetic, then
    * one integer division by the pixel count — deterministic across
    * JVMs and partitionings.
    */
  case class ImageFeatures(width: Long, height: Long, meanLumaX1000: Long)

  /** Decode real image bytes; None when the payload isn't a supported
    * image (the router to the stub fallback).
    */
  def decodeImage(payload: Array[Byte]): Option[ImageFeatures] = {
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      if (img == null) None
      else {
        val (w, h) = (img.getWidth, img.getHeight)
        var lumaSum = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            lumaSum += 299L * ((rgb >> 16) & 0xff) +
              587L * ((rgb >> 8) & 0xff) + 114L * (rgb & 0xff)
            x += 1
          }
          y += 1
        }
        Some(ImageFeatures(w.toLong, h.toLong, lumaSum / (w.toLong * h)))
      }
    } catch {
      // imageio throws RuntimeExceptions (IllegalArgument, IndexOOB,
      // NegativeArraySize…) on payloads with a valid magic number but
      // a corrupt body — the router must fall back to the stub, not
      // crash the media scan
      case scala.util.control.NonFatal(_) => None
    }
  }

  case class DecodedImageRecord(doc_id: Long, n_bytes: Long, is_real: Boolean,
      width: Long, height: Long, mean_luma_x1000: Long, n_frames: Long)

  /** The production decode path: REAL codec decode where the payload
    * is a decodable image, the deterministic stub otherwise (this
    * container's synthetic testdata carries utf-8 text payloads, so
    * the catalog queries exercise the fallback arm; MultimodalSpec
    * feeds a real in-memory-encoded PNG through the real arm and
    * asserts exact dimensions + luma). Same `mapPartitions` batch
    * shape — payloads never shuffle, decode is map-side.
    */
  def decodeAllReal(media: Dataset[MediaRecord]): Dataset[DecodedImageRecord] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { r =>
        decodeImage(r.payload) match {
          case Some(f) =>
            DecodedImageRecord(r.doc_id, r.payload.length.toLong, is_real = true,
              f.width, f.height, f.meanLumaX1000, 1L)
          case None =>
            val s = decodeStub(r.payload, r.doc_id)
            DecodedImageRecord(r.doc_id, r.payload.length.toLong, is_real = false,
              s.width, s.height, -1L, s.nFrames)
        }
      }
    }
  }

  /** §2.2 row 32 — metadata + stub-decoded features, expressed as pure
    * column arithmetic so DuckDB can oracle-check the plumbing.
    * (Must stay value-identical to [[decodeStub]]; the MultimodalSpec
    * asserts the two paths agree.)
    */
  val metaQuery: QueryDef = QueryDef(
    "m_multimodal_meta",
    (s, dir) => Tables.load(s, dir, "documents").select(
      col("doc_id"),
      octet_length(col("text")).cast("long").as("n_bytes"),
      md5(col("text")).as("content_md5"),
      (octet_length(col("text")).cast("long") % 640 + 32).as("width"),
      ((octet_length(col("text")).cast("long") * 7) % 480 + 32).as("height"),
      (col("doc_id") % 30 + 1).as("n_frames")),
    Some("""SELECT doc_id,
            CAST(OCTET_LENGTH(ENCODE(text)) AS BIGINT) AS n_bytes,
            md5(text) AS content_md5,
            CAST(OCTET_LENGTH(ENCODE(text)) AS BIGINT) % 640 + 32 AS width,
            (CAST(OCTET_LENGTH(ENCODE(text)) AS BIGINT) * 7) % 480 + 32 AS height,
            doc_id % 30 + 1 AS n_frames
            FROM documents"""))

  /** Frame sampling: expand each media item to its frames (batch
    * expansion — the explode side of decode) and keep every 3rd frame.
    * At scale this is map-side row generation; no shuffle.
    */
  val frameSample: QueryDef = QueryDef(
    "m_frame_sample",
    (s, dir) => Tables.load(s, dir, "documents")
      .select(col("doc_id"),
        explode(sequence(lit(1L), col("doc_id") % 30 + 1)).as("frame"))
      .where(col("frame") % 3 === 0),
    Some("""WITH f AS (SELECT doc_id, unnest(range(1, doc_id % 30 + 2)) AS frame FROM documents)
            SELECT doc_id, CAST(frame AS BIGINT) AS frame FROM f WHERE frame % 3 = 0"""))

  /** Patch/tile extraction — the vision-training prep shape (image →
    * fixed-size patch grid): each item expands map-side into its
    * 64×64 patch coordinates with clamped pixel bounds (the resize/
    * crop arithmetic a real decoder would apply per patch), sampled
    * modularly to bound output. Like frame sampling this is pure
    * map-side row generation — no shuffle, payloads never move, and
    * the patch grid prunes to metadata at the scan.
    */
  val patchGrid: QueryDef = QueryDef(
    "m_patch_grid",
    (s, dir) => {
      val P = 64L
      val w = octet_length(col("text")).cast("long") % 640 + 32
      val h = (octet_length(col("text")).cast("long") * 7) % 480 + 32
      val nx = ceil(w.cast("double") / P).cast("long")
      val ny = ceil(h.cast("double") / P).cast("long")
      Tables.load(s, dir, "documents")
        .select(col("doc_id"), w.as("w"), h.as("h"), nx.as("nx"), ny.as("ny"))
        .select(col("doc_id"), col("w"), col("h"), col("ny"),
          explode(sequence(lit(0L), col("nx") - 1)).as("px"))
        .select(col("doc_id"), col("w"), col("h"), col("px"),
          explode(sequence(lit(0L), col("ny") - 1)).as("py"))
        .where((col("px") + col("py")) % 5 === 0)
        .select(col("doc_id"), col("px"), col("py"),
          (col("px") * P).as("x0"), (col("py") * P).as("y0"),
          least(col("px") * P + P, col("w")).as("x1"),
          least(col("py") * P + P, col("h")).as("y1"))
    },
    Some("""WITH m AS (SELECT doc_id,
              CAST(OCTET_LENGTH(ENCODE(text)) AS BIGINT) % 640 + 32 AS w,
              (CAST(OCTET_LENGTH(ENCODE(text)) AS BIGINT) * 7) % 480 + 32 AS h
            FROM documents),
          g AS (SELECT doc_id, w, h,
              CAST(CEIL(CAST(w AS DOUBLE) / 64) AS BIGINT) AS nx,
              CAST(CEIL(CAST(h AS DOUBLE) / 64) AS BIGINT) AS ny
            FROM m),
          px AS (SELECT doc_id, w, h, ny, unnest(range(0, nx)) AS px FROM g),
          pp AS (SELECT doc_id, w, h, px, unnest(range(0, ny)) AS py FROM px)
          SELECT doc_id, CAST(px AS BIGINT) AS px, CAST(py AS BIGINT) AS py,
            CAST(px * 64 AS BIGINT) AS x0, CAST(py * 64 AS BIGINT) AS y0,
            LEAST(px * 64 + 64, w) AS x1, LEAST(py * 64 + 64, h) AS y1
          FROM pp WHERE (px + py) % 5 = 0"""))

  /** REAL-codec decode, ORACLE-CHECKED — closes the "catalog only
    * exercises the stub arm" caveat on row 32: the query synthesizes
    * a deterministic generative image set (pixel (x,y) of image i is
    * the EXACT rgb ((7x+3i)%256, (11y+5i)%256, (x+y+i)%256)), encodes
    * each to REAL PNG bytes, decodes them through the production
    * `javax.imageio` path ([[decodeAllReal]] — the same mapPartitions
    * batch shape a 100 TB media scan uses), and emits decode-derived
    * dims + exact BT.601 luma. The DuckDB oracle never sees a byte of
    * PNG: it recomputes ground truth from the GENERATIVE FORMULA — if
    * the decoder mangles any pixel, the luma hash fails. (PNG is
    * lossless and sRGB-profile-free for TYPE_INT_RGB, so the
    * roundtrip is bit-exact; encoded LENGTH is encoder-dependent and
    * deliberately excluded from the output.)
    *
    * Scale shape: synthesis is a tiny driver-built frame; decode is
    * per-row map work with payloads never shuffled — the exact
    * profile of a real media scan, minus the petabytes.
    */
  val imageDecodeReal: QueryDef = QueryDef(
    "m_image_decode_real",
    (s, dir) => {
      import s.implicits._
      val _ = dir // same synthetic set at every SF — the codec is the subject
      val images = (0 until 8).map { i =>
        val (w, h) = (16 + i, 8 + i)
        val img = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        for (y <- 0 until h; x <- 0 until w) {
          val rgb = (((7 * x + 3 * i) % 256) << 16) |
            (((11 * y + 5 * i) % 256) << 8) | ((x + y + i) % 256)
          img.setRGB(x, y, rgb)
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", bos)
        MediaRecord(i.toLong, bos.toByteArray)
      }
      decodeAllReal(s.createDataset(images))
        .toDF()
        .select(col("doc_id").as("img_id"), col("is_real"),
          col("width"), col("height"), col("mean_luma_x1000"))
    },
    Some("""WITH ids AS (SELECT unnest(range(0, 8)) AS i),
          dims AS (SELECT i, 16 + i AS w, 8 + i AS h FROM ids),
          xs AS (SELECT d.i, d.w, d.h, rx.x FROM dims d, LATERAL (
              SELECT unnest(range(0, d.w)) AS x) rx),
          px AS (SELECT i, w, h, x, unnest(range(0, h)) AS y FROM xs),
          lum AS (SELECT i, w, h,
              299 * ((7 * x + 3 * i) % 256) + 587 * ((11 * y + 5 * i) % 256)
                + 114 * ((x + y + i) % 256) AS l
            FROM px)
          SELECT i AS img_id, TRUE AS is_real, CAST(w AS BIGINT) AS width,
            CAST(h AS BIGINT) AS height,
            CAST(SUM(l) AS BIGINT) // (w * h) AS mean_luma_x1000
          FROM lum GROUP BY i, w, h"""))

  case class DHashRecord(img_id: Long, h0: Long, h1: Long)

  /** Difference-hash (dHash) of a decoded image: block-mean resize to
    * a 9×8 luma grid (exact integer sums, integral div), then one bit
    * per horizontal gradient sign — 64 bits packed as two NON-NEGATIVE
    * 32-bit halves (a single BIGINT would put bit 63 in the sign).
    * Uniform brightness shifts cancel in the gradient, which is the
    * whole point of hashing gradients instead of pixels.
    */
  def dhash(img: java.awt.image.BufferedImage): DHashRecord = {
    val (w, h) = (img.getWidth, img.getHeight)
    val sum = Array.ofDim[Long](8, 9)
    val cnt = Array.ofDim[Long](8, 9)
    for (y <- 0 until h; x <- 0 until w) {
      val rgb = img.getRGB(x, y)
      val l = 299L * ((rgb >> 16) & 0xff) + 587L * ((rgb >> 8) & 0xff) +
        114L * (rgb & 0xff)
      val cx = x * 9 / w; val cy = y * 8 / h
      sum(cy)(cx) += l; cnt(cy)(cx) += 1
    }
    var h0 = 0L; var h1 = 0L
    for (cy <- 0 until 8; cx <- 0 until 8) {
      val m0 = sum(cy)(cx) / cnt(cy)(cx)
      val m1 = sum(cy)(cx + 1) / cnt(cy)(cx + 1)
      if (m1 > m0) {
        val pos = cy * 8 + cx
        if (pos < 32) h0 |= 1L << pos else h1 |= 1L << (pos - 32)
      }
    }
    DHashRecord(-1L, h0, h1)
  }

  /** The generative near-dup image set the dHash query runs on: 8
    * base images (wrapping-gradient pattern, so the hash has varied
    * bits), 8 brightness-shifted VARIANTS of the bases (+5 per
    * channel, no clamp by construction — dHash-invariant, the planted
    * near-dups), 8 UNRELATED images (different wrap frequencies).
    * Same driver-built-synthesis shape as [[imageDecodeReal]]; the
    * oracle recomputes everything from this formula and never sees a
    * PNG byte.
    */
  def dhashImageSet(s: SparkSession): DataFrame = {
    import s.implicits._
    imageSet24(s).mapPartitions { it =>
      it.map { r =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(r.payload))
        dhash(img).copy(img_id = r.doc_id)
      }
    }.toDF()
  }

  /** The 24 generative PNGs behind the perceptual-near-dup AND the
    * visual-embedding queries — real encoded bytes, formula-derivable
    * pixels (see [[dhashImageSet]]'s doc for the three groups).
    */
  def imageSet24(s: SparkSession): Dataset[MediaRecord] = {
    import s.implicits._
    val images = (0 until 24).map { i =>
      val c = i / 8; val j = i % 8
      val (w, h) = (16 + j, 8 + j)
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) {
        val (r, g, b) = c match {
          case 0 => (((37 + 11 * j) * x + 3 * j) % 250,
            ((23 + 7 * j) * y + 5 * j) % 250,
            ((29 + 5 * j) * x + 17 * y + j) % 250)
          case 1 => (((37 + 11 * j) * x + 3 * j) % 250 + 5,
            ((23 + 7 * j) * y + 5 * j) % 250 + 5,
            ((29 + 5 * j) * x + 17 * y + j) % 250 + 5)
          case _ => ((7 * x * y + 13 * j) % 250,
            ((x + 2 * y) * (x + 1) + j) % 250,
            (x * x + 3 * y * y + 11 * j) % 250)
        }
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      MediaRecord(i.toLong, bos.toByteArray)
    }
    s.createDataset(images)
  }

  /** §2.2 row 32b — PERCEPTUAL near-dup detection over the REAL
    * decode path: dHash each image through the production
    * `javax.imageio` arm, band the 64-bit hash into 4×16-bit Hamming
    * LSH buckets (the MinHash-band pattern on bits — any shared band
    * seeds a candidate), verify candidates by exact Hamming distance
    * ≤ 6. The brightness-shifted variants land at Hamming 0 (gradient
    * hashing's invariance, proven by the planted pairs); unrelated
    * images must exceed the band gate or the verify threshold.
    *
    * Scale shape: hashing is map-side per image (payloads never
    * shuffle); the band join is the same bounded-bucket equi-join the
    * text near-dup stack uses — never an all-pairs compare; verify
    * touches only banded candidates.
    */
  val phashNearDup: QueryDef = QueryDef(
    "m_phash_neardup",
    (s, dir) => {
      val _ = dir // same synthetic set at every SF — the codec is the subject
      val hashes = dhashImageSet(s).localCheckpoint()
      val bands = hashes.select(col("img_id"), col("h0"), col("h1"))
        .select(col("img_id"), explode(expr(
          """arrays_zip(array(0L, 1L, 2L, 3L), array(
               h0 % 65536, (h0 div 65536) % 65536,
               h1 % 65536, (h1 div 65536) % 65536))""")).as("z"))
        .select(col("img_id"), col("z.0").as("bi"), col("z.1").as("bv"))
      val cand = bands.toDF("a", "bi", "bv")
        .join(bands.toDF("b", "bi", "bv"), Seq("bi", "bv"))
        .where(col("a") < col("b")).select("a", "b").distinct()
      cand
        .join(hashes.toDF("a", "h0a", "h1a"), "a")
        .join(hashes.toDF("b", "h0b", "h1b"), "b")
        .select(col("a").as("img_a"), col("b").as("img_b"),
          expr("cast(bit_count(h0a ^ h0b) + bit_count(h1a ^ h1b) as bigint)")
            .as("hamming"))
        .where(col("hamming") <= 6)
    },
    Some("""WITH ids AS (SELECT unnest(range(0, 24)) AS i),
          m AS (SELECT i, i // 8 AS c, i % 8 AS j,
              16 + (i % 8) AS w, 8 + (i % 8) AS h FROM ids),
          xs AS (SELECT m.*, rx.x FROM m, LATERAL (
              SELECT unnest(range(0, m.w)) AS x) rx),
          px AS (SELECT *, unnest(range(0, h)) AS y FROM xs),
          lum AS (SELECT i, w, h, x, y,
            CASE WHEN c = 0 THEN 299 * (((37 + 11*j)*x + 3*j) % 250)
                + 587 * (((23 + 7*j)*y + 5*j) % 250)
                + 114 * (((29 + 5*j)*x + 17*y + j) % 250)
              WHEN c = 1 THEN 299 * (((37 + 11*j)*x + 3*j) % 250 + 5)
                + 587 * (((23 + 7*j)*y + 5*j) % 250 + 5)
                + 114 * (((29 + 5*j)*x + 17*y + j) % 250 + 5)
              ELSE 299 * ((7*x*y + 13*j) % 250)
                + 587 * (((x + 2*y) * (x + 1) + j) % 250)
                + 114 * ((x*x + 3*y*y + 11*j) % 250) END AS l
            FROM px),
          cells AS (SELECT i, (x * 9) // w AS cx, (y * 8) // h AS cy,
              CAST(SUM(l) AS BIGINT) // COUNT(*) AS mn
            FROM lum GROUP BY 1, 2, 3),
          bits AS (SELECT a.i, a.cy * 8 + a.cx AS pos,
              CASE WHEN b.mn > a.mn THEN 1 ELSE 0 END AS bit
            FROM cells a JOIN cells b
              ON b.i = a.i AND b.cy = a.cy AND b.cx = a.cx + 1
            WHERE a.cx < 8),
          hsh AS (SELECT i,
              CAST(SUM(CASE WHEN pos < 32
                THEN bit * (CAST(1 AS BIGINT) << pos) ELSE 0 END) AS BIGINT) AS h0,
              CAST(SUM(CASE WHEN pos >= 32
                THEN bit * (CAST(1 AS BIGINT) << (pos - 32)) ELSE 0 END) AS BIGINT) AS h1
            FROM bits GROUP BY 1),
          bands AS (SELECT i, bb.bi,
              CASE bb.bi WHEN 0 THEN h0 % 65536 WHEN 1 THEN (h0 // 65536) % 65536
                WHEN 2 THEN h1 % 65536 ELSE (h1 // 65536) % 65536 END AS bv
            FROM hsh, (SELECT unnest(range(0, 4)) AS bi) bb),
          cand AS (SELECT DISTINCT x.i AS a, y.i AS b FROM bands x
            JOIN bands y ON x.bi = y.bi AND x.bv = y.bv AND x.i < y.i)
          SELECT c.a AS img_a, c.b AS img_b,
            CAST(bit_count(xor(ha.h0, hb.h0)) + bit_count(xor(ha.h1, hb.h1))
              AS BIGINT) AS hamming
          FROM cand c JOIN hsh ha ON ha.i = c.a JOIN hsh hb ON hb.i = c.b
          WHERE bit_count(xor(ha.h0, hb.h0)) + bit_count(xor(ha.h1, hb.h1)) <= 6"""))

  /** Encode 16-bit signed PCM mono samples as real WAV bytes through
    * the JDK's own audio stack (`javax.sound.sampled` — zero external
    * deps, the audio twin of the imageio path). Little-endian PCM is
    * lossless, so the roundtrip is bit-exact.
    */
  def encodeWav(samples: Array[Short], rate: Float): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(rate, 16, 1, true, false)
    val bytes = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      bytes(2 * i) = (samples(i) & 0xff).toByte
      bytes(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
      i += 1
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(bytes), fmt, samples.length.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Decode real WAV bytes to 16-bit samples; None when the payload
    * isn't decodable audio (the router to a stub arm, mirroring
    * [[decodeImage]]).
    */
  def decodeWav(payload: Array[Byte]): Option[Array[Short]] = {
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      val fmt = ais.getFormat
      if (fmt.getSampleSizeInBits != 16 || fmt.getChannels != 1) None
      else {
        val raw = ais.readAllBytes()
        val out = new Array[Short](raw.length / 2)
        var i = 0
        while (i < out.length) {
          val lo = raw(2 * i) & 0xff; val hi = raw(2 * i + 1) & 0xff
          val v = if (fmt.isBigEndian) (lo << 8) | hi else (hi << 8) | lo
          out(i) = v.toShort
          i += 1
        }
        Some(out)
      }
    } catch {
      case scala.util.control.NonFatal(_) => None
    }
  }

  /** §2.2 row 32c — REAL audio decode, ORACLE-CHECKED (the audio twin
    * of [[imageDecodeReal]]): deterministic generative PCM clips
    * (sample t of clip i is EXACTLY ((t·(7+2i)+13i) mod 2001) − 1000)
    * are encoded to real WAV bytes and decoded back through the
    * production `javax.sound.sampled` path; per 200-sample frame the
    * query emits the exact integer |amplitude| sum and energy Σv² —
    * the VAD/silence-trim features an audio-training pipeline cuts
    * on. The DuckDB oracle recomputes ground truth from the formula
    * and never sees a WAV byte: any decoder sample error fails the
    * hash (PCM16 is lossless, so the roundtrip is bit-exact).
    *
    * Scale shape: decode + framing is per-row map work in the same
    * mapPartitions batch shape as every media scan — payloads never
    * shuffle; the frame rollup keys are (clip, frame), corpus-sized
    * cardinality with map-side combine.
    */
  val audioDecodeReal: QueryDef = QueryDef(
    "m_audio_decode_real",
    (s, dir) => {
      import s.implicits._
      val _ = dir // same synthetic set at every SF — the codec is the subject
      val clips = (0 until 8).map { i =>
        val n = 800 + 100 * i
        val samples = Array.tabulate(n)(t =>
          (((t.toLong * (7 + 2 * i) + 13 * i) % 2001) - 1000).toShort)
        MediaRecord(i.toLong, encodeWav(samples, 8000f))
      }
      s.createDataset(clips).mapPartitions { it =>
        it.flatMap { r =>
          val samples = decodeWav(r.payload).getOrElse(
            sys.error(s"clip ${r.doc_id}: WAV decode failed"))
          samples.iterator.zipWithIndex.map { case (v, t) =>
            (r.doc_id, t.toLong / 200, math.abs(v.toLong), v.toLong * v)
          }
        }
      }.toDF("clip_id", "frame", "av", "e")
        .groupBy("clip_id", "frame")
        .agg(count(lit(1)).as("n_samples"), sum(col("av")).as("sum_abs"),
          sum(col("e")).as("energy"))
    },
    Some("""WITH ids AS (SELECT unnest(range(0, 8)) AS i),
            t AS (SELECT i, unnest(range(0, 800 + 100 * i)) AS t FROM ids),
            a AS (SELECT i, t,
                ((t * (7 + 2 * i) + 13 * i) % 2001) - 1000 AS v FROM t)
            SELECT CAST(i AS BIGINT) AS clip_id, CAST(t // 200 AS BIGINT) AS frame,
              COUNT(*) AS n_samples, CAST(SUM(ABS(v)) AS BIGINT) AS sum_abs,
              CAST(SUM(v * v) AS BIGINT) AS energy
            FROM a GROUP BY 1, 2"""))

  /** VOICE-ACTIVITY / silence segmentation through the REAL WAV decode
    * arm — the trim pass a speech pipeline runs before paying ASR:
    * per clip, silent-frame count, first/last ACTIVE frame (the trim
    * boundaries), and the longest silent run (gaps-and-islands over
    * the frame grid). The generative clips PLANT silence — frame f is
    * zeroed when f² mod 7 < 2, giving head-runs of 2 and interior
    * runs of 3 — so the audit is non-trivial and the DuckDB oracle
    * recomputes it from the formula without seeing a WAV byte: a
    * single decoder sample error flips a frame's energy off zero and
    * fails the hash (PCM16 roundtrip is bit-exact).
    *
    * Scale shape: decode + framing is the same map-side
    * mapPartitions batch as every media scan (payloads never
    * shuffle); frame energies aggregate on (clip, frame) with
    * map-side combine, and the islands window runs on the frames
    * grid — 200× smaller than the sample stream.
    */
  val audioVad: QueryDef = QueryDef(
    "m_audio_vad",
    (s, dir) => {
      import s.implicits._
      val _ = dir // same synthetic set at every SF — the codec is the subject
      val clips = (0 until 8).map { i =>
        val n = 800 + 200 * i
        val samples = Array.tabulate(n) { t =>
          val f = t / 200
          if ((f.toLong * f) % 7 < 2) 0.toShort
          else (((t.toLong * (7 + 2 * i) + 13 * i) % 2001) - 1000).toShort
        }
        MediaRecord(i.toLong, encodeWav(samples, 8000f))
      }
      val frames = s.createDataset(clips).mapPartitions { it =>
        it.flatMap { r =>
          val samples = decodeWav(r.payload).getOrElse(
            sys.error(s"clip ${r.doc_id}: WAV decode failed"))
          samples.iterator.zipWithIndex.map { case (v, t) =>
            (r.doc_id, t.toLong / 200, v.toLong * v)
          }
        }
      }.toDF("clip_id", "frame", "e")
        .groupBy("clip_id", "frame").agg(sum(col("e")).as("energy"))
        .withColumn("silent", when(col("energy") === 0, 1L).otherwise(0L))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("clip_id").orderBy("frame")
      val runs = frames.where(col("silent") === 1)
        .withColumn("grp", col("frame") - row_number().over(w))
        .groupBy("clip_id", "grp").agg(count(lit(1)).as("run"))
        .groupBy("clip_id").agg(max(col("run")).as("run_max"))
      frames.groupBy("clip_id")
        .agg(count(lit(1)).as("n_frames"),
          sum(col("silent")).as("n_silent"),
          min(when(col("silent") === 0, col("frame"))).as("first_active"),
          max(when(col("silent") === 0, col("frame"))).as("last_active"))
        .join(runs, Seq("clip_id"), "left")
        .withColumn("longest_silent_run", coalesce(col("run_max"), lit(0L)))
        .drop("run_max")
    },
    Some("""WITH ids AS (SELECT unnest(range(0, 8)) AS i),
            t AS (SELECT i, unnest(range(0, 800 + 200 * i)) AS t FROM ids),
            a AS (SELECT i, t // 200 AS frame,
                CASE WHEN ((t // 200) * (t // 200)) % 7 < 2 THEN 0
                  ELSE ((t * (7 + 2 * i) + 13 * i) % 2001) - 1000 END AS v
              FROM t),
            f AS (SELECT i, frame, SUM(v * v) AS energy FROM a GROUP BY 1, 2),
            ff AS (SELECT i, frame,
                CASE WHEN energy = 0 THEN 1 ELSE 0 END AS silent FROM f),
            isl AS (SELECT i, grp, COUNT(*) AS run FROM
                (SELECT i, frame - ROW_NUMBER() OVER
                   (PARTITION BY i ORDER BY frame) AS grp
                 FROM ff WHERE silent = 1) GROUP BY 1, 2),
            lr AS (SELECT i, MAX(run) AS run_max FROM isl GROUP BY 1)
            SELECT CAST(ff.i AS BIGINT) AS clip_id, COUNT(*) AS n_frames,
              CAST(SUM(silent) AS BIGINT) AS n_silent,
              MIN(CASE WHEN silent = 0 THEN frame END) AS first_active,
              MAX(CASE WHEN silent = 0 THEN frame END) AS last_active,
              CAST(COALESCE(MAX(lr.run_max), 0) AS BIGINT) AS longest_silent_run
            FROM ff LEFT JOIN lr ON lr.i = ff.i GROUP BY 1"""))

  /** SHOT-BOUNDARY detection through the REAL image decode arm — the
    * video-curation pass that segments footage before sampling
    * training frames (one frame per shot beats N per second of the
    * same still scene): two generative "videos" (24 PNG frames each,
    * per-shot base brightness planted at different cadences — shots
    * of 6 frames in video 0, 7 in video 1) decode through
    * `javax.imageio`, and a frame is a boundary when its mean-luma
    * delta vs the previous frame exceeds the threshold (planted jump
    * ≈ 40 000 ×1000-luma vs ≤ ~1 000 in-shot wobble — spec-asserted
    * separation). The DuckDB oracle recomputes luma from the pixel
    * formula without seeing a PNG byte: any decoder error moves a
    * mean and fails the hash (PNG is lossless).
    *
    * Scale shape: decode + luma is per-frame map work (payloads never
    * shuffle); the boundary test is one lag window per video over the
    * frames-per-video grid.
    */
  val videoShots: QueryDef = QueryDef(
    "m_video_shots",
    (s, dir) => {
      import s.implicits._
      val _ = dir // same synthetic set at every SF — the codec is the subject
      val frames = (0 until 2).flatMap { v =>
        val L = 6 + v
        (0 until 24).map { f =>
          val base = 40 * ((f / L) % 5)
          val img = new java.awt.image.BufferedImage(16, 8,
            java.awt.image.BufferedImage.TYPE_INT_RGB)
          for (y <- 0 until 8; x <- 0 until 16) {
            val r = base + (3 * x + v) % 16
            val g = base + (5 * y) % 16
            val b = base + (x + y + f) % 16
            img.setRGB(x, y, (r << 16) | (g << 8) | b)
          }
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", bos)
          MediaRecord(v * 1000L + f, bos.toByteArray)
        }
      }
      val luma = decodeAllReal(s.createDataset(frames)).toDF()
        .select(expr("doc_id div 1000").as("video_id"),
          (col("doc_id") % 1000).as("frame"), col("mean_luma_x1000"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("video_id").orderBy("frame")
      luma.withColumn("prev_luma_x1000",
          lag(col("mean_luma_x1000"), 1).over(w))
        .where(col("prev_luma_x1000").isNotNull &&
          abs(col("mean_luma_x1000") - col("prev_luma_x1000")) > 15000)
        .select(col("video_id"), col("frame"), col("prev_luma_x1000"),
          col("mean_luma_x1000").as("luma_x1000"),
          (col("mean_luma_x1000") - col("prev_luma_x1000")).as("jump_x1000"))
    },
    Some("""WITH vids AS (SELECT unnest(range(0, 2)) AS v),
            fr AS (SELECT v, unnest(range(0, 24)) AS f FROM vids),
            xs AS (SELECT v, f, unnest(range(0, 16)) AS x FROM fr),
            px AS (SELECT v, f, x, unnest(range(0, 8)) AS y FROM xs),
            lum AS (SELECT v, f,
                299 * (40 * ((f // (6 + v)) % 5) + (3 * x + v) % 16)
              + 587 * (40 * ((f // (6 + v)) % 5) + (5 * y) % 16)
              + 114 * (40 * ((f // (6 + v)) % 5) + (x + y + f) % 16) AS l
              FROM px),
            ml AS (SELECT v, f, CAST(SUM(l) AS BIGINT) // 128 AS luma
              FROM lum GROUP BY 1, 2),
            lg AS (SELECT v, f, luma,
                LAG(luma) OVER (PARTITION BY v ORDER BY f) AS prev
              FROM ml)
            SELECT CAST(v AS BIGINT) AS video_id, CAST(f AS BIGINT) AS frame,
              prev AS prev_luma_x1000, luma AS luma_x1000,
              luma - prev AS jump_x1000
            FROM lg WHERE prev IS NOT NULL AND ABS(luma - prev) > 15000"""))

  case class ExposureRecord(img_id: Long, n_px: Long, n_under: Long,
    n_over: Long, min_luma_x1000: Long, max_luma_x1000: Long,
    under_share_x1000: Long, over_share_x1000: Long)

  /** §2.2 row 32f — image EXPOSURE audit through the REAL decode arm:
    * per image, the share of under-exposed (< 50/255 luma) and
    * over-exposed (> 200/255) pixels plus the luma extremes — the
    * standard quality gate a vision-pretraining pipeline applies
    * before spending tokens on a frame (all-black thumbnails,
    * blown-out scans). Same deterministic generative PNG set as
    * `m_image_decode_real`, decoded by the production `javax.imageio`
    * path; the DuckDB oracle recomputes every pixel from the
    * GENERATIVE FORMULA — a single mangled pixel near either
    * threshold fails the hash, so this also deepens the codec check
    * from mean luma to the full histogram tails.
    *
    * Scale shape: decode + histogram is per-row map work (payloads
    * never shuffle); output is one row per image.
    */
  val imageExposure: QueryDef = QueryDef(
    "m_image_exposure",
    (s, dir) => {
      import s.implicits._
      val _ = dir // same synthetic set at every SF — the codec is the subject
      val images = (0 until 8).map { i =>
        val (w, h) = (16 + i, 8 + i)
        val img = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        for (y <- 0 until h; x <- 0 until w) {
          val rgb = (((7 * x + 3 * i) % 256) << 16) |
            (((11 * y + 5 * i) % 256) << 8) | ((x + y + i) % 256)
          img.setRGB(x, y, rgb)
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", bos)
        MediaRecord(i.toLong, bos.toByteArray)
      }
      s.createDataset(images).mapPartitions { it =>
        it.map { r =>
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(r.payload))
          var n = 0L; var under = 0L; var over = 0L
          var mn = Long.MaxValue; var mx = Long.MinValue
          var y = 0
          while (y < img.getHeight) {
            var x = 0
            while (x < img.getWidth) {
              val rgb = img.getRGB(x, y)
              val l = 299L * ((rgb >> 16) & 0xff) +
                587L * ((rgb >> 8) & 0xff) + 114L * (rgb & 0xff)
              n += 1
              if (l < 50000L) under += 1
              if (l > 200000L) over += 1
              if (l < mn) mn = l
              if (l > mx) mx = l
              x += 1
            }
            y += 1
          }
          ExposureRecord(r.doc_id, n, under, over, mn, mx,
            under * 1000 / n, over * 1000 / n)
        }
      }.toDF()
    },
    Some("""WITH ids AS (SELECT unnest(range(0, 8)) AS i),
          dims AS (SELECT i, 16 + i AS w, 8 + i AS h FROM ids),
          xs AS (SELECT d.i, d.w, d.h, rx.x FROM dims d, LATERAL (
              SELECT unnest(range(0, d.w)) AS x) rx),
          px AS (SELECT i, w, h, x, unnest(range(0, h)) AS y FROM xs),
          lum AS (SELECT i, w, h,
              299 * ((7 * x + 3 * i) % 256) + 587 * ((11 * y + 5 * i) % 256)
                + 114 * ((x + y + i) % 256) AS l
            FROM px)
          SELECT i AS img_id, CAST(COUNT(*) AS BIGINT) AS n_px,
            CAST(SUM(CASE WHEN l < 50000 THEN 1 ELSE 0 END) AS BIGINT) AS n_under,
            CAST(SUM(CASE WHEN l > 200000 THEN 1 ELSE 0 END) AS BIGINT) AS n_over,
            CAST(MIN(l) AS BIGINT) AS min_luma_x1000,
            CAST(MAX(l) AS BIGINT) AS max_luma_x1000,
            CAST(SUM(CASE WHEN l < 50000 THEN 1 ELSE 0 END) * 1000
              // COUNT(*) AS BIGINT) AS under_share_x1000,
            CAST(SUM(CASE WHEN l > 200000 THEN 1 ELSE 0 END) * 1000
              // COUNT(*) AS BIGINT) AS over_share_x1000
          FROM lum GROUP BY 1"""))

  /** §2.2 row 32g — audio LOUDNESS / CLIPPING audit through the REAL
    * PCM16 decode arm: per clip, the full-scale-clipped sample count
    * and share ×10⁶, peak |sample| and the integral level Σ|v| — the
    * gate a speech pipeline applies before paying ASR on blown-out or
    * near-silent recordings (the audio twin of `m_image_exposure`).
    * The generative clips PLANT clipping: the raw waveform ranges
    * ±35000 and is clamped to the int16 rails, so a deterministic
    * share of samples sits at exactly ±32767; the DuckDB oracle
    * recomputes every sample from the formula without seeing a WAV
    * byte — one decoder sample error moves a count off the rail and
    * fails the hash (PCM16 roundtrip is bit-exact).
    *
    * Scale shape: decode + histogram is per-row map work (payloads
    * never shuffle); output is one row per clip.
    */
  val audioLoudness: QueryDef = QueryDef(
    "m_audio_loudness",
    (s, dir) => {
      import s.implicits._
      val _ = dir // same synthetic set at every SF — the codec is the subject
      val clips = (0 until 8).map { i =>
        val n = 800 + 100 * i
        val samples = Array.tabulate(n) { t =>
          val raw = ((t.toLong * (11 + 2 * i) + 17 * i) % 70001) - 35000
          math.max(-32767L, math.min(32767L, raw)).toShort
        }
        MediaRecord(i.toLong, encodeWav(samples, 8000f))
      }
      s.createDataset(clips).mapPartitions { it =>
        it.map { r =>
          val samples = decodeWav(r.payload).getOrElse(
            sys.error(s"clip ${r.doc_id}: WAV decode failed"))
          var clipped = 0L; var peak = 0L; var sumAbs = 0L
          samples.foreach { v =>
            val a = math.abs(v.toLong)
            if (a == 32767L) clipped += 1
            if (a > peak) peak = a
            sumAbs += a
          }
          (r.doc_id, samples.length.toLong, clipped,
            clipped * 1000000L / samples.length, peak, sumAbs)
        }
      }.toDF("clip_id", "n_samples", "n_clipped", "clipped_x1e6",
        "peak_abs", "sum_abs")
    },
    Some("""WITH ids AS (SELECT unnest(range(0, 8)) AS i),
            t AS (SELECT i, unnest(range(0, 800 + 100 * i)) AS t FROM ids),
            a AS (SELECT i, t, GREATEST(-32767, LEAST(32767,
                ((t * (11 + 2 * i) + 17 * i) % 70001) - 35000)) AS v FROM t)
            SELECT CAST(i AS BIGINT) AS clip_id,
              COUNT(*) AS n_samples,
              CAST(SUM(CASE WHEN ABS(v) = 32767 THEN 1 ELSE 0 END) AS BIGINT)
                AS n_clipped,
              CAST(SUM(CASE WHEN ABS(v) = 32767 THEN 1 ELSE 0 END) * 1000000
                // COUNT(*) AS BIGINT) AS clipped_x1e6,
              CAST(MAX(ABS(v)) AS BIGINT) AS peak_abs,
              CAST(SUM(ABS(v)) AS BIGINT) AS sum_abs
            FROM a GROUP BY 1"""))

  case class PatchVec(vec_id: Long, q: Seq[Long])

  /** 64-dim visual embedding of a decoded image: block-mean luma over
    * an 8×8 patch grid, row-major — exact integer sums and integral
    * division, so both engines derive identical vectors.
    */
  def patchMeanVector(img: java.awt.image.BufferedImage): Array[Long] = {
    val (w, h) = (img.getWidth, img.getHeight)
    val sum = Array.ofDim[Long](8, 8)
    val cnt = Array.ofDim[Long](8, 8)
    for (y <- 0 until h; x <- 0 until w) {
      val rgb = img.getRGB(x, y)
      val l = 299L * ((rgb >> 16) & 0xff) + 587L * ((rgb >> 8) & 0xff) +
        114L * (rgb & 0xff)
      val cx = x * 8 / w; val cy = y * 8 / h
      sum(cy)(cx) += l; cnt(cy)(cx) += 1
    }
    (for (cy <- 0 until 8; cx <- 0 until 8)
      yield sum(cy)(cx) / cnt(cy)(cx)).toArray
  }

  /** §2.2 row 32h — IMAGE EMBEDDING + kNN through the REAL decode: the
    * end-to-end multimodal retrieval composition (decode → visual
    * embedding → cosine top-k) a media pipeline runs before any model
    * exists. Each image of the generative near-dup set
    * ([[dhashImageSet]]'s formula — 8 bases, 8 brightness-shifted
    * variants, 8 unrelated) decodes through the production
    * `javax.imageio` arm and embeds as its 8×8 block-mean luma vector
    * ([[patchMeanVector]] — the classic pre-neural GIST-style visual
    * descriptor); every image's top-3 cosine neighbors follow. The
    * DuckDB oracle never sees a PNG byte: it re-derives every patch
    * mean from the generative pixel formula, so any decoder or
    * pooling error fails the hash. The planted brightness variants
    * surface as their bases' top neighbors — embedding retrieval
    * recovering the near-dups dHash finds by gradient invariance.
    *
    * Scale shape: decode + pooling are map-side per image (payloads
    * never shuffle); the kNN is the bounded brute pass of
    * `s_knn_bruteforce` (at corpus scale the vectors feed the IVF/PQ
    * serving tiers — this query fixes the embedding contract).
    */
  val imageEmbedKnn: QueryDef = QueryDef(
    "m_image_embed_knn",
    (s, dir) => {
      import s.implicits._
      val _ = dir // same synthetic set at every SF — the codec is the subject
      val vecs = imageSet24(s).mapPartitions { it =>
        it.map { r =>
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(r.payload))
          PatchVec(r.doc_id, patchMeanVector(img).toSeq)
        }
      }.toDF()
      val v = vecs.withColumn("nrm", Similarity.dotL(col("q"), col("q")))
        .localCheckpoint()
      val q = broadcast(v.toDF("q_id", "q_q", "q_nrm"))
      val scored = q.join(v.toDF("n_id", "n_q", "n_nrm"),
          col("n_id") =!= col("q_id"))
        .select(col("q_id"), col("n_id"),
          Similarity.cosine(Similarity.dotL(col("q_q"), col("n_q")),
            col("q_nrm"), col("n_nrm")).as("sim"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("q_id").orderBy(col("sim").desc, col("n_id"))
      scored.withColumn("rn", row_number().over(w)).where(col("rn") <= 3)
        .select("q_id", "n_id", "sim")
    },
    Some("""WITH ids AS (SELECT unnest(range(0, 24)) AS i),
          dims AS (SELECT i, i // 8 AS c, i % 8 AS j,
              16 + (i % 8) AS w, 8 + (i % 8) AS h FROM ids),
          xs AS (SELECT d.i, d.c, d.j, d.w, d.h, rx.x FROM dims d, LATERAL (
              SELECT unnest(range(0, d.w)) AS x) rx),
          px AS (SELECT i, c, j, w, h, x, unnest(range(0, h)) AS y FROM xs),
          lum AS (SELECT i,
              CASE WHEN c = 0 THEN
                  299*(((37 + 11*j)*x + 3*j) % 250)
                + 587*(((23 + 7*j)*y + 5*j) % 250)
                + 114*(((29 + 5*j)*x + 17*y + j) % 250)
              WHEN c = 1 THEN
                  299*((((37 + 11*j)*x + 3*j) % 250) + 5)
                + 587*((((23 + 7*j)*y + 5*j) % 250) + 5)
                + 114*((((29 + 5*j)*x + 17*y + j) % 250) + 5)
              ELSE
                  299*((7*x*y + 13*j) % 250)
                + 587*(((x + 2*y)*(x + 1) + j) % 250)
                + 114*((x*x + 3*y*y + 11*j) % 250) END AS l,
              (y * 8) // h AS cy, (x * 8) // w AS cx
            FROM px),
          cell AS (SELECT i, cy, cx,
              CAST(SUM(l) AS BIGINT) // COUNT(*) AS m
            FROM lum GROUP BY 1, 2, 3),
          vec AS (SELECT i AS vec_id, list(m ORDER BY cy, cx) AS q
            FROM cell GROUP BY 1),
          n AS (SELECT vec_id, q,
              CAST(list_sum(list_transform(q, z -> z*z)) AS BIGINT) AS nrm FROM vec),
          p AS (SELECT a.vec_id AS q_id, b.vec_id AS n_id,
              CAST(list_sum(list_transform(list_zip(a.q, b.q), z -> z[1]*z[2])) AS BIGINT) AS dot,
              a.nrm AS na, b.nrm AS nb
            FROM n a JOIN n b ON b.vec_id <> a.vec_id),
          sc AS (SELECT q_id, n_id,
              CAST(dot AS DOUBLE) / SQRT(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)) AS sim FROM p)
          SELECT q_id, n_id, sim FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id) AS rn
            FROM sc) x WHERE rn <= 3"""))

  val defs: Seq[QueryDef] = Seq(metaQuery, frameSample, patchGrid,
    imageDecodeReal, phashNearDup, audioDecodeReal, audioVad, videoShots,
    imageExposure, audioLoudness, imageEmbedKnn)
}
