package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{GQuery, Tables => T}

/** Multimodal-column plumbing (SURVEY.md §2.6; BASELINE.json north star:
  * "multimodal columns"): media payloads as opaque `binary` columns with a
  * typed metadata struct alongside, plus decode / feature-extract /
  * frame-sample operators.
  *
  * The container has no image/audio codecs, so the DECODE STEP IS A
  * DETERMINISTIC STUB (byte-histogram "features", byte-slice "frames") —
  * clearly marked below. Everything around it is the real Spark plumbing
  * that matters at 100 TB: binary column + metadata struct schema, batched
  * per-partition UDF execution, column pruning (payload is only read by
  * queries that touch it), and aggregation over extracted features.
  */
object Multimodal {

  private val ChunkBytes = 256
  private val ThumbBytes = 8

  /** Synthesize a media table from `documents`: utf-8 payload bytes +
    * typed metadata — the schema a real pipeline would carry
    * (payload binary, media_type string, meta struct<...>).
    */
  private[graft] def media(s: SparkSession, d: String): DataFrame =
    T.documents(s, d).select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      expr("CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END")
        .as("media_type"),
      struct(
        octet_length(encode(col("text"), "UTF-8")).as("n_bytes"),
        col("lang").as("lang"),
        col("source").as("source")).as("meta"))

  /** Deterministic P6 payload for `doc_id` — the test-fixture generator
    * feeding the REAL decoder below. Dimensions and every pixel byte are
    * pure functions of the id, so a DuckDB oracle can compute the
    * expected decoded features arithmetically while the Spark side must
    * round-trip through genuine PPM bytes and a genuine parser.
    */
  private[graft] def synthPpm(id: Long): Array[Byte] = {
    val w = (4 + id % 5).toInt
    val h = (3 + id % 4).toInt
    val px = new Array[Byte](3 * w * h)
    var j = 0
    while (j < px.length) {
      px(j) = ((id * 31 + j.toLong * 7) % 256).toByte
      j += 1
    }
    MediaCodecs.encodePpm(w, h, px)
  }

  /** Deterministic PCM-16 mono WAV payload for `doc_id`. */
  private[graft] def synthWav(id: Long): Array[Byte] = {
    val sr = (8000 + (id % 3) * 4000).toInt
    val n = (50 + id % 32).toInt
    val samples = new Array[Short](n)
    var i = 0
    while (i < n) {
      samples(i) = ((id * 131 + i.toLong * 17) % 4001 - 2000).toShort
      i += 1
    }
    MediaCodecs.encodeWav(sr, 1, samples)
  }

  val queries: Seq[GQuery] = Seq(

    // ---- metadata over binary payloads (oracle-checked) ---------------
    GQuery("multimodal_meta",
      (s, d) => media(s, d).select(
          col("doc_id"), col("media_type"),
          octet_length(col("payload")).as("payload_bytes"),
          ceil(octet_length(col("payload")) / lit(ChunkBytes.toDouble)).as("n_chunks"),
          col("meta.lang").as("lang"))
        .orderBy("doc_id"),
      Some(s"""SELECT doc_id,
        CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END
          AS media_type,
        CAST(octet_length(encode(text)) AS INT) AS payload_bytes,
        CAST(ceil(octet_length(encode(text)) / $ChunkBytes.0) AS BIGINT) AS n_chunks,
        lang
        FROM documents ORDER BY doc_id""")),

    // ---- frame sampling: first byte of every chunk (oracle-checked) ---
    // stands in for video frame-sampling: deterministic positions, output
    // one row per sampled "frame"
    GQuery("multimodal_frames",
      (s, d) => media(s, d)
        .select(col("doc_id"),
          // raw BYTE at each chunk start (hex round-trip), not the decoded
          // character — byte-true for non-ASCII payloads
          // empty payloads yield ZERO frames (sequence(0,-1) would count
          // DOWN and fabricate rows — same trap as Text.triExpr)
          posexplode(expr(
            s"""CASE WHEN octet_length(payload) > 0 THEN
                  transform(sequence(0, CAST(ceil(octet_length(payload) / $ChunkBytes.0) AS INT) - 1),
                    c -> CAST(conv(hex(substring(payload, c * $ChunkBytes + 1, 1)), 16, 10) AS INT))
                ELSE CAST(array() AS array<int>) END""")))
        .withColumnRenamed("pos", "frame_id").withColumnRenamed("col", "first_byte")
        .orderBy("doc_id", "frame_id"),
      Some(s"""WITH f AS (SELECT doc_id, hex(encode(text)) AS hx,
            CAST(ceil(octet_length(encode(text)) / $ChunkBytes.0) AS BIGINT) AS nc
          FROM documents),
        g AS (SELECT doc_id, hx, unnest(generate_series(0, nc - 1)) AS fid FROM f)
        SELECT doc_id, CAST(fid AS INT) AS frame_id,
          CAST(('0x' || substr(hx, CAST(fid AS INT) * $ChunkBytes * 2 + 1, 2)) AS INT) AS first_byte
        FROM g ORDER BY doc_id, frame_id""")),

    // ---- resize / thumbnail via batched per-partition execution -------
    // STUB resize (deterministic byte downsample to ThumbBytes positions
    // i·n/k — a real pipeline would decode+rescale pixels here), but the
    // execution contract is the real one: a typed mapPartitions over the
    // binary payloads, the Spark-idiomatic shape of vectorized batch
    // UDFs — one iterator per partition, no per-row driver involvement.
    GQuery("multimodal_resize",
      (s, d) => {
        import s.implicits._
        val m = media(s, d)
          .select(col("doc_id"), col("media_type"), col("payload"))
          .as[(Long, String, Array[Byte])]
        m.mapPartitions { it =>
          it.map { case (id, mt, p) =>
            val n = if (p == null) 0 else p.length
            val thumb =
              if (n == 0) ""
              else (0 until ThumbBytes)
                .map(i => f"${p((i.toLong * n / ThumbBytes).toInt) & 0xff}%02X")
                .mkString
            ResizedMedia(id, mt, thumb)
          }
        }.toDF().orderBy("doc_id")
      },
      Some {
        val terms = (0 until ThumbBytes)
          .map(i => s"substr(hx, CAST(($i * n) // $ThumbBytes AS INT) * 2 + 1, 2)")
          .mkString(" || ")
        s"""WITH f AS (SELECT doc_id,
            CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END
              AS media_type,
            hex(encode(text)) AS hx, octet_length(encode(text)) AS n
          FROM documents)
        SELECT doc_id, media_type,
          CASE WHEN COALESCE(n, 0) = 0 THEN '' ELSE $terms END AS thumb_hex
        FROM f ORDER BY doc_id"""
      }),

    // ---- REAL image decode: PPM (P6) payloads through a pure-JVM ------
    // parser (MediaCodecs.decodePpm), batched per partition — the
    // vectorized-decoder execution contract with an actual decoder in
    // it. Payload bytes are synthesized deterministically from doc_id,
    // so the oracle reconstructs the expected features arithmetically;
    // the Spark side must round-trip real header parsing + raster math.
    // Features are EXACT integers (dimensions + per-channel sums) so the
    // hash compare has no float tolerance to hide behind.
    GQuery("multimodal_features",
      (s, d) => {
        import s.implicits._
        val payloads = T.documents(s, d).select(col("doc_id")).as[Long]
          .mapPartitions(_.map(id => (id, synthPpm(id))))
          .toDF("doc_id", "payload")
        payloads.as[(Long, Array[Byte])].mapPartitions { it =>
          it.map { case (id, bytes) =>
            val img = MediaCodecs.decodePpm(bytes)
            var (sr, sg, sb) = (0L, 0L, 0L)
            var p = 0
            while (p < img.width * img.height) {
              sr += img.pixels(3 * p) & 0xff
              sg += img.pixels(3 * p + 1) & 0xff
              sb += img.pixels(3 * p + 2) & 0xff
              p += 1
            }
            ImageFeatures(id, img.width, img.height, sr, sg, sb)
          }
        }.toDF().orderBy("doc_id")
      },
      Some("""WITH docs AS (
          SELECT doc_id, CAST(4 + doc_id % 5 AS INT) AS w,
                 CAST(3 + doc_id % 4 AS INT) AS h
          FROM documents),
        px AS (SELECT doc_id, w, h, unnest(generate_series(0, w*h - 1)) AS p
               FROM docs),
        ch AS (SELECT doc_id, w, h, p, c.c,
                 (doc_id * 31 + (3*p + c.c) * 7) % 256 AS v
               FROM px CROSS JOIN (SELECT * FROM (VALUES (0),(1),(2)) AS t(c)) c)
        SELECT doc_id, max(w) AS width, max(h) AS height,
          CAST(sum(CASE WHEN c = 0 THEN v END) AS BIGINT) AS sum_r,
          CAST(sum(CASE WHEN c = 1 THEN v END) AS BIGINT) AS sum_g,
          CAST(sum(CASE WHEN c = 2 THEN v END) AS BIGINT) AS sum_b
        FROM ch GROUP BY doc_id ORDER BY doc_id""")),

    // ---- REAL audio decode: RIFF/WAVE PCM-16 through the chunk-walking
    // parser (MediaCodecs.decodeWav); same oracle scheme — exact-integer
    // amplitude features of deterministically synthesized waveforms
    GQuery("multimodal_audio",
      (s, d) => {
        import s.implicits._
        val payloads = T.documents(s, d).select(col("doc_id")).as[Long]
          .mapPartitions(_.map(id => (id, synthWav(id))))
          .toDF("doc_id", "payload")
        payloads.as[(Long, Array[Byte])].mapPartitions { it =>
          it.map { case (id, bytes) =>
            val wav = MediaCodecs.decodeWav(bytes)
            var sumAbs = 0L
            var maxAbs = 0
            wav.samples.foreach { v =>
              val a = math.abs(v.toInt)
              sumAbs += a
              if (a > maxAbs) maxAbs = a
            }
            AudioFeatures(id, wav.sampleRate, wav.samples.length, sumAbs, maxAbs)
          }
        }.toDF().orderBy("doc_id")
      },
      Some("""WITH a AS (
          SELECT doc_id, CAST(8000 + (doc_id % 3) * 4000 AS INT) AS sr,
                 CAST(50 + doc_id % 32 AS INT) AS n
          FROM documents),
        s AS (SELECT doc_id, sr, n, unnest(generate_series(0, n - 1)) AS i
              FROM a),
        v AS (SELECT doc_id, sr, n,
                (doc_id * 131 + i * 17) % 4001 - 2000 AS x
              FROM s)
        SELECT doc_id, max(sr) AS sample_rate, max(n) AS n_samples,
          CAST(sum(abs(x)) AS BIGINT) AS sum_abs,
          CAST(max(abs(x)) AS INT) AS max_abs
        FROM v GROUP BY doc_id ORDER BY doc_id"""))
  )
}

/** typed output rows of the REAL decoders */
final case class ImageFeatures(doc_id: Long, width: Int, height: Int,
    sum_r: Long, sum_g: Long, sum_b: Long)
final case class AudioFeatures(doc_id: Long, sample_rate: Int,
    n_samples: Int, sum_abs: Long, max_abs: Int)

/** typed output row of `multimodal_resize` */
final case class ResizedMedia(doc_id: Long, media_type: String, thumb_hex: String)
