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

  /** STUB decoder (deterministic fake): real deployments would decode
    * image/audio via a vectorized native library here; the Spark-side
    * contract (binary in, fixed-width float vector out, executed
    * per-partition in batches) is the part under test.
    */
  private val histogramUdf = udf { (payload: Array[Byte]) =>
    val hist = new Array[Float](16)
    if (payload != null) {
      var i = 0
      while (i < payload.length) {
        hist((payload(i) & 0xFF) >> 4) += 1f
        i += 1
      }
      val n = math.max(payload.length, 1).toFloat
      var j = 0
      while (j < 16) { hist(j) /= n; j += 1 }
    }
    hist
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

    // ---- feature extraction via the stubbed decoder (rows-only) -------
    GQuery("multimodal_features",
      (s, d) => media(s, d)
        .withColumn("features", histogramUdf(col("payload")))
        .withColumn("entropy", expr(
          "aggregate(features, 0D, (s, x) -> s + if(x > 0, -x * ln(x), 0D))"))
        .groupBy("media_type")
        .agg(round(avg(col("entropy")), 4).as("avg_entropy"),
          count(lit(1)).as("n_docs"))
        .orderBy("media_type"),
      None)
  )
}

/** typed output row of `multimodal_resize` */
final case class ResizedMedia(doc_id: Long, media_type: String, thumb_hex: String)
