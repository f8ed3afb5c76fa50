package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column surface (builder-prompt LLM-pipeline requirement):
  * image/audio/video payloads as opaque `binary` columns with typed
  * metadata, plus a decode/feature-extract stage.
  *
  * The fixtures carry no binary column, so a deterministic one is
  * synthesized from `documents.text` (the bytes ARE the utf-8 text —
  * pure, reproducible in DuckDB as a BLOB cast). Two surfaces:
  *
  *   - metadata extraction with built-in expressions (oracle-checked);
  *   - [[encodePartitions]] / [[decodePartitions]] — a REAL image codec
  *     round-trip through `javax.imageio` (in the JDK, no new
  *     dependency): the encode stage renders each document's bytes into
  *     a genuine grayscale PNG, the decode stage parses those PNG bytes
  *     back into dimensions + a pixel checksum. Because the rendered
  *     image is a pure function of (n_chars, text), the DECODED values
  *     are oracle-checkable arithmetic in DuckDB while the Spark side
  *     actually exercises a binary codec on real compressed bytes. At
  *     scale this is the standard shape: narrow per-partition
  *     transform, no shuffle, codec state allocated once per partition
  *     (not per row); production swaps the encode stage for reading
  *     real blobs — decode is already the real thing.
  */
object Multimodal {

  /** documents with a synthetic binary payload column. */
  def withBlob(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .withColumn("payload", col("text").cast("binary"))

  private val pngSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("png", BinaryType)))

  private val decodedSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_pixels", IntegerType),
    StructField("checksum", LongType)))

  private val resizedSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("out_w", IntegerType),
    StructField("out_h", IntegerType),
    StructField("checksum", LongType)))

  /** Spec-conformant PNG encoder for 8-bit grayscale: signature, IHDR,
    * one IDAT holding the zlib-deflated filter-0 scanlines, IEND — with
    * per-chunk CRC32s. Hand-rolled instead of `ImageIO.write` because
    * the ImageIO path costs ~1 ms/blob in stream wrappers and writer
    * machinery on KB-sized images; this writes the same format ~10×
    * faster, and the decode stage still parses it with the JDK's OWN
    * reader — encoder and decoder are independent implementations, so
    * the checksum match is a genuine cross-implementation round-trip.
    * The Deflater is allocated once per partition and `reset()` per
    * blob.
    */
  private def pngEncode(deflater: java.util.zip.Deflater,
      w: Int, h: Int, gray: Array[Byte]): Array[Byte] = {
    val crc = new java.util.zip.CRC32()
    val out = new java.io.ByteArrayOutputStream(gray.length / 2 + 128)
    def be32(v: Int): Array[Byte] = Array(
      (v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
    def chunk(tag: String, body: Array[Byte]): Unit = {
      out.write(be32(body.length))
      val t = tag.getBytes("US-ASCII")
      out.write(t); out.write(body)
      crc.reset(); crc.update(t); crc.update(body)
      out.write(be32(crc.getValue.toInt))
    }
    out.write(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
      .map(_.toByte))
    // IHDR: width, height, bit depth 8, color type 0 (grayscale),
    // compression 0, filter 0, interlace 0
    chunk("IHDR", be32(w) ++ be32(h) ++ Array[Byte](8, 0, 0, 0, 0))
    // scanlines, each prefixed with filter byte 0 (None)
    val raw = new Array[Byte](h * (w + 1))
    var y = 0
    while (y < h) {
      System.arraycopy(gray, y * w, raw, y * (w + 1) + 1, w)
      y += 1
    }
    deflater.reset()
    deflater.setInput(raw)
    deflater.finish()
    val zout = new java.io.ByteArrayOutputStream(raw.length / 2 + 64)
    val buf = new Array[Byte](4096)
    while (!deflater.finished())
      zout.write(buf, 0, deflater.deflate(buf))
    chunk("IDAT", zout.toByteArray)
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** Render each document into a real grayscale PNG: width =
    * n_chars%64+1, height = n_chars%48+1, pixel(i) = code point of the
    * (i mod n_chars)-th character (the fixture text is pure ASCII, so
    * code point == gray level ≤ 127 and the 8-bit round trip is exact).
    * Uses [[pngEncode]] with a partition-scoped Deflater; the bytes are
    * genuinely zlib-compressed and the decode stage's independent JDK
    * parser must inflate them to get the pixels back.
    */
  /** The codec stages are CPU-bound per ROW, but Spark sizes scan
    * partitions by BYTES (maxPartitionBytes bin-packing) — a corpus of
    * small text rows packs into very few partitions and the whole
    * encode→decode chain then runs on a handful of cores (measured:
    * sf1's 5.7 MB documents table became ONE partition = one thread =
    * 24 s of serialized codec work). Hash-repartitioning on doc_id to
    * the cluster's parallelism before the codec stage costs one tiny
    * shuffle and decouples codec parallelism from input byte size —
    * the standard move before any expensive per-row transform. */
  private def codecSpread(docs: DataFrame): DataFrame =
    docs.repartition(
      docs.sparkSession.sparkContext.defaultParallelism, col("doc_id"))

  def encodePartitions(docs0: DataFrame): DataFrame = {
    val docs = codecSpread(docs0)
    val enc = org.apache.spark.sql.Encoders.row(pngSchema)
    docs.select("doc_id", "text").mapPartitions { it =>
      val deflater = new java.util.zip.Deflater(
        java.util.zip.Deflater.BEST_SPEED)
      it.map { r =>
        val id = r.getLong(0)
        val text = r.getString(1)
        val n = text.length
        val w = n % 64 + 1
        val h = n % 48 + 1
        val data = new Array[Byte](w * h)
        // empty text renders as a single black pixel (the array stays
        // zeroed) — `i % n` must not run with n == 0
        var i = 0
        while (n > 0 && i < w * h) {
          data(i) = text.charAt(i % n).toByte
          i += 1
        }
        Row(id, pngEncode(deflater, w, h, data))
      }
    }(enc)
  }

  /** mapPartitions decode stage — a real `javax.imageio` PNG parse per
    * blob, with the `ImageReader` allocated once per partition (the
    * codec-per-partition shape a native decoder needs too). The pixel
    * walk reads the decoded raster's backing byte array when the image
    * comes back 8-bit gray (the per-sample API otherwise). The checksum
    * is the sum of decoded pixel samples mod 1000003 — it can only come
    * out right if the inflate round-trip reproduced every byte.
    */
  def decodePartitions(blobs: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(decodedSchema)
    blobs.select("doc_id", "png").mapPartitions { it =>
      val reader = javax.imageio.ImageIO
        .getImageReadersByFormatName("png").next()
      it.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        // MemoryCacheImageInputStream, NOT ImageIO.createImageInputStream:
        // the factory default is a FILE-backed cache stream — one temp
        // file created+deleted per blob, which turns the decode stage
        // into a kernel-syscall storm (measured 90%+ system CPU across
        // 21 cores at sf1). The blob is already fully in memory.
        val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
          new java.io.ByteArrayInputStream(bytes))
        reader.setInput(iis)
        val img = reader.read(0)
        iis.close()
        val (w, h) = (img.getWidth, img.getHeight)
        var sum = 0L
        img.getRaster.getDataBuffer match {
          case b: java.awt.image.DataBufferByte
              if img.getType ==
                java.awt.image.BufferedImage.TYPE_BYTE_GRAY =>
            val data = b.getData
            var i = 0
            while (i < data.length) { sum += data(i) & 0xff; i += 1 }
          case _ =>
            val raster = img.getRaster
            var i = 0
            while (i < w * h) {
              sum += raster.getSample(i % w, i / w, 0)
              i += 1
            }
        }
        Row(id, w, h, w * h, sum % 1000003L)
      }
    }(enc)
  }

  /** mapPartitions resize stage — decode the real PNG and nearest-
    * neighbor sample it into a thumbnail fitting a 16×16 box
    * (preserving aspect, upscaling small images — the "fit" contract):
    * sx = ⌊ox·w/out_w⌋, sy = ⌊oy·h/out_h⌋, all integer division. The
    * reader is per-partition like [[decodePartitions]]; the checksum
    * over SAMPLED pixels can only come out right if both the inflate
    * round-trip and the NN index arithmetic are correct — which is
    * exactly what the oracle recomputes from the document text.
    */
  def resizePartitions(blobs: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(resizedSchema)
    val box = 16
    blobs.select("doc_id", "png").mapPartitions { it =>
      val reader = javax.imageio.ImageIO
        .getImageReadersByFormatName("png").next()
      it.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        // MemoryCacheImageInputStream, NOT ImageIO.createImageInputStream:
        // the factory default is a FILE-backed cache stream — one temp
        // file created+deleted per blob, which turns the decode stage
        // into a kernel-syscall storm (measured 90%+ system CPU across
        // 21 cores at sf1). The blob is already fully in memory.
        val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
          new java.io.ByteArrayInputStream(bytes))
        reader.setInput(iis)
        val img = reader.read(0)
        iis.close()
        val (w, h) = (img.getWidth, img.getHeight)
        val m = math.max(w, h)
        val ow = math.max(1, w * box / m)
        val oh = math.max(1, h * box / m)
        val raster = img.getRaster
        var sum = 0L
        var p = 0
        while (p < ow * oh) {
          val sx = (p % ow) * w / ow
          val sy = (p / ow) * h / oh
          sum += raster.getSample(sx, sy, 0)
          p += 1
        }
        Row(id, w, h, ow, oh, sum % 1000003L)
      }
    }(enc)
  }

  val all: Seq[Q] = Seq(

    // ----- the real resize: render → PNG → decode → nearest-neighbor
    // thumbnail, all inside the partition-scoped codec stage. The
    // oracle recomputes the SAMPLED pixel checksum arithmetically from
    // the text (pixel(i) = charCode(i mod n), NN index
    // (⌊oy·h/oh⌋·w + ⌊ox·w/ow⌋) mod n) — the row hash-matches only if
    // decode AND the resampling index math both agree byte-for-byte.
    Q("m_multimodal_resize_real",
      (s, d) => resizePartitions(
        encodePartitions(Tables.documents(s, d))).orderBy("doc_id"),
      Some(
        """WITH dims AS (
          |  SELECT doc_id, text, n_chars,
          |    CAST(n_chars % 64 + 1 AS INT) AS w,
          |    CAST(n_chars % 48 + 1 AS INT) AS h
          |  FROM documents
          |), boxed AS (
          |  SELECT doc_id, text, n_chars, w, h,
          |    greatest(CAST(w * 16 // greatest(w, h) AS INT), 1) AS ow,
          |    greatest(CAST(h * 16 // greatest(w, h) AS INT), 1) AS oh
          |  FROM dims
          |)
          |SELECT doc_id, w AS width, h AS height,
          |  ow AS out_w, oh AS out_h,
          |  CASE WHEN n_chars = 0 THEN CAST(0 AS BIGINT)
          |       ELSE CAST(list_sum(list_transform(range(ow * oh),
          |         p -> ascii(substr(text,
          |           CAST(((p // ow) * h // oh) * w +
          |                ((p % ow) * w // ow) AS INT) % n_chars + 1,
          |           1)))) % 1000003 AS BIGINT) END AS checksum
          |FROM boxed ORDER BY doc_id""".stripMargin)),

    // ----- typed metadata over the binary column, pure built-ins
    Q("m_multimodal_meta",
      (s, d) => withBlob(s, d)
        .select(col("doc_id"),
          length(col("payload")).as("n_bytes"),
          hex(substring(col("payload"), 1, 4)).as("magic"),
          (length(col("payload")) % 640 + 1).as("width"),
          ((length(col("payload")) * 3) % 480 + 1).as("height"))
        .orderBy("doc_id"),
      Some(
        """SELECT doc_id,
          |  CAST(octet_length(CAST(text AS BLOB)) AS INT) AS n_bytes,
          |  upper(hex(substr(text, 1, 4))) AS magic,
          |  CAST(octet_length(CAST(text AS BLOB)) % 640 + 1 AS INT) AS width,
          |  CAST(octet_length(CAST(text AS BLOB)) * 3 % 480 + 1 AS INT)
          |    AS height
          |FROM documents ORDER BY doc_id""".stripMargin)),

    // ----- resize: fit the (fake) decoded dimensions into a 224x224 box
    // preserving aspect ratio — integer arithmetic only, so the "codec
    // math" itself is oracle-checked; a real resize swaps the pixel op
    // into the mapPartitions stage of m_multimodal_decode.
    Q("m_multimodal_resize",
      (s, d) => withBlob(s, d)
        .select(col("doc_id"),
          (length(col("payload")) % 640 + 1).as("width"),
          ((length(col("payload")) * 3) % 480 + 1).as("height"))
        .withColumn("scale_num", lit(224))
        .withColumn("scale_den", greatest(col("width"), col("height")))
        .select(col("doc_id"), col("width"), col("height"),
          greatest((col("width") * col("scale_num")).cast("long")
            / col("scale_den"), lit(1)).cast("int").as("out_w"),
          greatest((col("height") * col("scale_num")).cast("long")
            / col("scale_den"), lit(1)).cast("int").as("out_h"))
        .orderBy("doc_id"),
      Some(
        """WITH m AS (
          |  SELECT doc_id,
          |    CAST(octet_length(CAST(text AS BLOB)) % 640 + 1 AS INT)
          |      AS width,
          |    CAST(octet_length(CAST(text AS BLOB)) * 3 % 480 + 1 AS INT)
          |      AS height
          |  FROM documents)
          |SELECT doc_id, width, height,
          |  CAST(greatest((width * 224) // greatest(width, height), 1)
          |       AS INT) AS out_w,
          |  CAST(greatest((height * 224) // greatest(width, height), 1)
          |       AS INT) AS out_h
          |FROM m ORDER BY doc_id""".stripMargin)),

    // ----- frame sampling: every k-th byte of the payload is a "frame";
    // emit (frame_no, frame_byte) rows — the plan shape of video frame
    // extraction (generator over an opaque payload), all built-ins.
    Q("m_multimodal_frames",
      (s, d) => withBlob(s, d)
        .filter(col("doc_id") < 50)
        .withColumn("chars", split(col("text"), ""))
        .select(col("doc_id"),
          posexplode(transform(
            sequence(lit(1), expr("cast((length(text) - 1) div 16 as int) + 1")),
            i => ascii(element_at(col("chars"), (i - 1) * 16 + 1))))
            .as(Seq("frame_no", "frame_byte")))
        .orderBy("doc_id", "frame_no"),
      Some(
        """SELECT doc_id, CAST(i - 1 AS INT) AS frame_no,
          |       ascii(substr(text, (i - 1) * 16 + 1, 1)) AS frame_byte
          |FROM documents,
          |  LATERAL (SELECT unnest(range(1,
          |    (octet_length(CAST(text AS BLOB)) - 1) // 16 + 2)) AS i)
          |WHERE doc_id < 50
          |ORDER BY doc_id, frame_no""".stripMargin)),

    // ----- the real codec round trip: render → compressed PNG bytes →
    // javax.imageio decode. The oracle recomputes what the DECODER must
    // find (dimensions and the pixel-sample checksum) from the document
    // text arithmetically — the row can only hash-match if the PNG
    // inflate reproduced every encoded pixel.
    Q("m_multimodal_decode",
      (s, d) => decodePartitions(
        encodePartitions(Tables.documents(s, d))).orderBy("doc_id"),
      Some(
        """SELECT doc_id,
          |  CAST(n_chars % 64 + 1 AS INT) AS width,
          |  CAST(n_chars % 48 + 1 AS INT) AS height,
          |  CAST((n_chars % 64 + 1) * (n_chars % 48 + 1) AS INT)
          |    AS n_pixels,
          |  CASE WHEN n_chars = 0 THEN CAST(0 AS BIGINT)
          |       ELSE CAST(list_sum(list_transform(
          |         range((n_chars % 64 + 1) * (n_chars % 48 + 1)),
          |         i -> ascii(substr(text, CAST(i % n_chars AS INT) + 1,
          |                           1))))
          |         % 1000003 AS BIGINT) END AS checksum
          |FROM documents ORDER BY doc_id""".stripMargin)),

    // ----- shard packing for blob datasets (the WebDataset/tar-shard
    // ingest layout): blobs pack greedily into ~2 KB shards per source
    // in stable doc_id order — a running byte sum windowed per source,
    // shard = (cum-1) div SIZE. This is how a training job turns
    // millions of small blobs into sequential-read archives; the window
    // shuffles once on source and everything else is map-side. Byte
    // counts are exact integers (fixture text is pure ASCII, so
    // length(payload) == n_chars — pinned by the oracle using n_chars).
    Q("m_multimodal_shard",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        withBlob(s, d)
          .select(col("source"), col("doc_id"),
            length(col("payload")).cast("long").as("nb"))
          .withColumn("cum", sum(col("nb")).over(w))
          .withColumn("shard", expr("(cum - 1) div 2048"))
          .groupBy("source", "shard")
          .agg(count(lit(1)).as("n_blobs"), sum(col("nb")).as("bytes"),
            min(col("doc_id")).as("first_doc"),
            max(col("doc_id")).as("last_doc"))
          .orderBy("source", "shard")
      },
      Some(
        """WITH sized AS (
          |  SELECT source, doc_id, n_chars,
          |    sum(n_chars) OVER (PARTITION BY source ORDER BY doc_id
          |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
          |  FROM documents
          |), tagged AS (
          |  SELECT source, doc_id, n_chars,
          |    CAST((cum - 1) // 2048 AS BIGINT) AS shard
          |  FROM sized)
          |SELECT source, shard, count(*) AS n_blobs,
          |  CAST(sum(n_chars) AS BIGINT) AS bytes,
          |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
          |FROM tagged GROUP BY source, shard
          |ORDER BY source, shard""".stripMargin)),

    // ----- the second modality, same contract as m_multimodal_decode:
    // a REAL audio codec round trip. Encode renders each document into
    // a genuine RIFF/WAVE file (PCM s16le mono 8 kHz — hand-rolled
    // header + sample writer, the pngEncode philosophy); decode parses
    // those bytes with the JDK's OWN independent WAV reader
    // (`javax.sound.sampled.AudioSystem`, java.desktop — no new
    // dependency, headless-safe: it only parses bytes) and walks the
    // PCM frames back out. Samples are a pure function of the text
    // (sample i = codepoint(text[i mod n]) × 257, filling the 16-bit
    // range), so the DECODED frame count, sample rate, and sample-sum
    // checksum are oracle-checkable arithmetic in DuckDB — they can
    // only match if the independent parser agreed byte-for-byte with
    // the writer on header layout AND little-endian sample framing.
    // Same scale shape as the image path: narrow mapPartitions, no
    // shuffle, no driver involvement; production replaces the encode
    // stage with real blob reads.
    Q("m_multimodal_audio",
      (s, d) => decodeWavPartitions(
        encodeWavPartitions(Tables.documents(s, d))).orderBy("doc_id"),
      Some(
        """SELECT doc_id,
          |  CAST(n_chars % 400 + 8 AS INT) AS n_samples,
          |  CAST(8000 AS INT) AS sample_rate,
          |  CASE WHEN n_chars = 0 THEN CAST(0 AS BIGINT)
          |       ELSE CAST(list_sum(list_transform(
          |         range(n_chars % 400 + 8),
          |         i -> ascii(substr(text, CAST(i % n_chars AS INT) + 1,
          |                           1)) * 257))
          |         % 1000003 AS BIGINT) END AS checksum
          |FROM documents ORDER BY doc_id""".stripMargin)),
  )

  private val wavSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("wav", BinaryType)))

  private val audioSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("n_samples", IntegerType),
    StructField("sample_rate", IntegerType),
    StructField("checksum", LongType)))

  /** Render each document into a real WAV blob: PCM s16le, mono,
    * 8 kHz; n_chars%400+8 samples, sample i = codepoint(text[i mod
    * n]) × 257 (ASCII ≤ 127 → values ≤ 32639, inside signed-16 range,
    * so the bits written are the unsigned value read back). Empty text
    * renders 8 zero samples. Spec-conformant RIFF: fmt chunk then data
    * chunk, all sizes little-endian.
    */
  def encodeWavPartitions(docs0: DataFrame): DataFrame = {
    val docs = codecSpread(docs0) // see encodePartitions: CPU-bound
    val enc = org.apache.spark.sql.Encoders.row(wavSchema)
    docs.select("doc_id", "text").mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val text = r.getString(1)
        val n = text.length
        val nS = n % 400 + 8
        val dataLen = nS * 2
        val out = new Array[Byte](44 + dataLen)
        def le32(off: Int, v: Int): Unit = {
          out(off) = v.toByte; out(off + 1) = (v >>> 8).toByte
          out(off + 2) = (v >>> 16).toByte; out(off + 3) = (v >>> 24).toByte
        }
        def tag(off: Int, t: String): Unit = {
          val b = t.getBytes("US-ASCII")
          System.arraycopy(b, 0, out, off, 4)
        }
        tag(0, "RIFF"); le32(4, 36 + dataLen); tag(8, "WAVE")
        tag(12, "fmt "); le32(16, 16)
        out(20) = 1; out(21) = 0 // PCM
        out(22) = 1; out(23) = 0 // mono
        le32(24, 8000) // sample rate
        le32(28, 16000) // byte rate
        out(32) = 2; out(33) = 0 // block align
        out(34) = 16; out(35) = 0 // bits per sample
        tag(36, "data"); le32(40, dataLen)
        var i = 0
        while (n > 0 && i < nS) {
          val u = text.charAt(i % n).toInt * 257
          out(44 + 2 * i) = (u & 0xff).toByte
          out(44 + 2 * i + 1) = ((u >>> 8) & 0xff).toByte
          i += 1
        }
        Row(id, out)
      }
    }(enc)
  }

  /** mapPartitions decode stage: `AudioSystem.getAudioInputStream`
    * parses the RIFF header (format, channels, rate, frame count) and
    * streams the PCM payload; samples are rebuilt from the frame bytes
    * little-endian and checksummed mod 1000003 — the value can only
    * come out right if the JDK's reader located the data chunk exactly
    * where the writer put it.
    */
  def decodeWavPartitions(blobs: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(audioSchema)
    blobs.select("doc_id", "wav").mapPartitions { it =>
      // resolve THE succeeding AudioFileReader provider once per
      // partition (the PNG path's ImageReader discipline) and reuse it
      // for every blob. Two per-blob traps measured on 32 threads:
      // the AudioSystem facade re-runs a synchronized SPI scan per
      // call, and even a raw provider-list walk stalls — the list
      // leads with SoftMidiAudioFileReader, whose rejection probe
      // routes through the GLOBALLY SYNCHRONIZED
      // JDK13Services.getProviders (thread dump: 31/32 executor
      // threads BLOCKED on that monitor, CPU idle, 13 s wall for 50k
      // sub-KB blobs). Probing the provider order once per partition
      // and pinning the winner makes the per-blob path lock-free.
      val readers = {
        val it2 = java.util.ServiceLoader
          .load(classOf[javax.sound.sampled.spi.AudioFileReader])
          .iterator()
        val buf = scala.collection.mutable.ArrayBuffer
          .empty[javax.sound.sampled.spi.AudioFileReader]
        while (it2.hasNext) buf += it2.next()
        buf.toArray
      }
      var chosen: javax.sound.sampled.spi.AudioFileReader = null
      def open(bytes: Array[Byte])
          : javax.sound.sampled.AudioInputStream = {
        if (chosen != null)
          // a homogeneous blob column decodes with one provider; if a
          // later blob genuinely isn't WAV, fail loudly below rather
          // than silently re-probing as a different format
          return chosen.getAudioInputStream(
            new java.io.ByteArrayInputStream(bytes))
        var i = 0
        while (i < readers.length) {
          try {
            val ais = readers(i).getAudioInputStream(
              new java.io.ByteArrayInputStream(bytes))
            chosen = readers(i)
            return ais
          } catch {
            case _: javax.sound.sampled.UnsupportedAudioFileException =>
          }
          i += 1
        }
        // loud-failure policy: an unparseable blob is data corruption
        throw new javax.sound.sampled.UnsupportedAudioFileException(
          s"no provider of ${readers.length} recognises the blob")
      }
      it.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        val ais = open(bytes)
        val fmt = ais.getFormat
        require(fmt.getChannels == 1 &&
          fmt.getSampleSizeInBits == 16 && !fmt.isBigEndian,
          s"unexpected decoded format for doc $id: $fmt")
        val rate = fmt.getSampleRate.toInt
        val nFrames = ais.getFrameLength.toInt
        val pcm = ais.readAllBytes()
        ais.close()
        var sum = 0L
        var i = 0
        while (i + 1 < pcm.length) {
          sum += (pcm(i) & 0xff) | ((pcm(i + 1) & 0xff) << 8)
          i += 2
        }
        Row(id, nFrames, rate, sum % 1000003L)
      }
    }(enc)
  }
}
