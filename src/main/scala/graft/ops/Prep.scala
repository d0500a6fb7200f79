package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.{GQuery, Tables => T}

/** Training-data preparation operators: token-window chunking, PII
  * redaction, and embedding quantization — the steps between a cleaned
  * corpus and a tokenizer/trainer. All three are pure per-row codegen'd
  * expressions (no shuffle, no UDF, no state), so they stream through a
  * 100 TB scan at I/O speed and compose with any upstream filter — the
  * scan stays the only cost.
  */
object Prep {

  // ---- token-window chunking -----------------------------------------

  /** Split each document into token windows of `size` tokens overlapping
    * by `overlap` (the context-window packing precursor: fixed-size
    * chunks, boundary-straddling text kept by the overlap). Emits one
    * row per (doc, window): (all doc columns, start, n_tokens, chunk).
    * Tokens are lower-cased alphanumeric runs; trailing windows may be
    * short; an empty document yields one empty chunk (so no document
    * silently disappears from the pipeline).
    */
  def chunk(docs: DataFrame, textCol: String, window: Int, overlap: Int): DataFrame = {
    require(window > 0 && overlap >= 0 && overlap < window,
      s"need 0 <= overlap < window, got window=$window overlap=$overlap")
    val stride = window - overlap
    docs
      .withColumn("_tk",
        expr(s"regexp_extract_all(lower($textCol), '[a-z0-9]+', 0)"))
      // starts stop at size - overlap: a later start would emit a chunk
      // made ENTIRELY of tokens the previous chunk already carried (its
      // tail sits inside the predecessor's overlap), which at corpus
      // scale is a systematic duplication bias in the training text
      .withColumn("start",
        explode(expr(s"sequence(1, greatest(size(_tk) - $overlap, 1), $stride)")))
      .withColumn("n_tokens", size(slice(col("_tk"), col("start"), lit(window))))
      .withColumn("chunk",
        array_join(slice(col("_tk"), col("start"), lit(window)), " "))
      .drop("_tk")
  }

  // ---- PII redaction --------------------------------------------------

  /** Scrub emails, NANP-style phone numbers, and IPv4 addresses to
    * typed placeholders. Three chained regexp_replace calls — one pass
    * each through codegen, no UDF. The patterns are deliberately
    * conservative (word-boundary-anchored, no catastrophic backtracking
    * constructs) so they behave identically under Java regex and RE2.
    */
  def redactPii(text: Column): Column = {
    val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val phone = "\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b"
    val ip = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
    regexp_replace(
      regexp_replace(
        regexp_replace(text, email, "<EMAIL>"),
        phone, "<PHONE>"),
      ip, "<IP>")
  }

  // ---- embedding int8 quantization -----------------------------------

  /** Symmetric per-vector int8 quantization: q_i = floor(x_i · 127 / m)
    * with m = max |x_i| (the standard storage/IVF-PQ-lite compression of
    * an embedding column — 4× smaller, dot products in integer space).
    * Zero vectors quantize to zeros. The arithmetic is one IEEE multiply
    * and one divide per element, both exactly rounded, so quantization
    * is bit-reproducible on any engine.
    */
  def quantizeInt8(emb: Column): Column = {
    val m = array_max(transform(emb, x => abs(x.cast("double"))))
    // bind m ONCE per row through an outer single-element transform: a
    // bare reference to `m` inside the per-element lambda would inline
    // and re-evaluate the whole array_max per element — O(d²) per row
    element_at(transform(array(m), mv =>
      transform(emb, x =>
        when(mv === 0.0, 0L)
          .otherwise(floor(x.cast("double") * lit(127.0) / mv)))), 1)
  }

  // ---- sequence packing ----------------------------------------------

  /** Pack documents into training sequences of at most `budget` tokens
    * (next-fit over a deterministic order): returns (doc_id, bucket,
    * seq) where (bucket, seq) is the global sequence key.
    *
    * Packing is inherently sequential — each placement depends on the
    * running total — so the scalable shape is MANY INDEPENDENT PACK
    * STREAMS: docs are sharded by a salted content hash into `buckets`
    * streams, each stream packs next-fit in doc_id order inside one
    * task (the one justified mapPartitions in this module: genuine
    * per-partition imperative state). Output is a pure function of
    * (ids, token counts, budget, buckets) — independent of cluster
    * parallelism, file order, and re-runs, the same reproducibility
    * contract as [[Sampling]]. At 100 TB, `buckets` is the parallelism
    * dial; a doc larger than the budget gets a sequence of its own.
    */
  def packSequences(
      docs: DataFrame, idCol: String, tokCol: String,
      budget: Long, buckets: Int = 8): DataFrame = {
    require(budget > 0 && buckets > 0)
    val spark = docs.sparkSession
    import spark.implicits._
    val keyed = docs.select(
      col(idCol).cast("long").as("doc_id"),
      col(tokCol).cast("long").as("tok"),
      (conv(substring(md5(concat(col(idCol).cast("string"), lit(":pack"))), 1, 8), 16, 10)
        .cast("long") % buckets).as("bucket"))
    keyed
      .repartition(buckets, col("bucket"))
      .sortWithinPartitions(col("bucket"), col("doc_id"))
      .as[(Long, Long, Long)]
      .mapPartitions { it =>
        var cur = Long.MinValue; var acc = 0L; var seq = 0L
        it.map { case (id, tok, b) =>
          if (b != cur) { cur = b; acc = tok; seq = 0L }
          else if (acc + tok > budget) { acc = tok; seq += 1 }
          else acc += tok
          (id, b, seq)
        }
      }
      .toDF("doc_id", "bucket", "seq")
  }

  /** DuckDB replay of [[packSequences]] — the ONE definition of the
    * recursive next-fit CTE every pack oracle composes (doc_seq_pack,
    * doc_bpe_pack, doc_curation_pipeline must agree on the exact
    * bucket hash and accumulator rules or a semantics change would
    * silently desynchronize one of them). `src` is a CTE providing
    * (doc_id, tok); the caller appends
    * `SELECT doc_id, bucket, seq FROM packed`. CTE names are
    * pk-prefixed to stay collision-free inside composite oracles.
    */
  private[graft] def packOracleCtes(
      src: String, budget: Long = 256, buckets: Int = 8): String =
    s"""pk0 AS (SELECT doc_id,
          ('0x' || substr(md5(doc_id::VARCHAR || ':pack'), 1, 8))::BIGINT % $buckets AS bucket,
          tok
        FROM $src),
    pkd AS (SELECT *, row_number() OVER (PARTITION BY bucket ORDER BY doc_id) AS rn
            FROM pk0),
    packed AS (
      SELECT bucket, rn, doc_id, tok, tok AS acc, 0::BIGINT AS seq
      FROM pkd WHERE rn = 1
      UNION ALL
      SELECT pkd.bucket, pkd.rn, pkd.doc_id, pkd.tok,
        CASE WHEN p.acc + pkd.tok > $budget THEN pkd.tok ELSE p.acc + pkd.tok END,
        CASE WHEN p.acc + pkd.tok > $budget THEN p.seq + 1 ELSE p.seq END
      FROM packed p JOIN pkd ON pkd.bucket = p.bucket AND pkd.rn = p.rn + 1)"""

  // ---- fixture queries ------------------------------------------------

  val queries: Seq[GQuery] = Seq(

    GQuery("doc_chunks",
      (s, d) => chunk(T.documents(s, d), "text", window = 40, overlap = 10)
        .select(col("doc_id"), col("start"), col("n_tokens"), col("chunk"))
        .orderBy("doc_id", "start"),
      Some("""WITH d AS (SELECT doc_id,
                regexp_extract_all(lower(text), '[a-z0-9]+') AS tk
              FROM documents)
        SELECT doc_id, CAST(i AS INT) AS start,
          CAST(len(list_slice(tk, i, i + 39)) AS INT) AS n_tokens,
          array_to_string(list_slice(tk, i, i + 39), ' ') AS chunk
        FROM d, unnest(generate_series(1, greatest(len(tk) - 10, 1), 30)) AS s(i)
        ORDER BY doc_id, start""")),

    // deterministic PII is appended to each doc, then scrubbed; the
    // oracle asserts the EXPECTED OUTPUT directly (it never runs the
    // redaction regexes), so regex behavior is checked, not echoed
    GQuery("doc_pii_redact",
      (s, d) => T.documents(s, d)
        .withColumn("dirty", concat(
          col("text"),
          lit(" contact u"), col("doc_id"),
          lit("@mail.example.org or 415-555-"),
          lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0"),
          lit(" at 10.0."), pmod(col("doc_id"), lit(256)), lit(".7")))
        .select(col("doc_id"), redactPii(col("dirty")).as("clean"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id,
          text || ' contact <EMAIL> or <PHONE> at <IP>' AS clean
        FROM documents ORDER BY doc_id""")),

    // next-fit packing of the corpus into 256-token sequences over 8
    // content-hash streams; the oracle replays the same next-fit per
    // stream with a recursive CTE
    GQuery("doc_seq_pack",
      (s, d) => packSequences(
        T.documents(s, d).withColumn("tok",
          expr("CAST(size(regexp_extract_all(lower(text), '[a-z0-9]+', 0)) AS BIGINT)")),
        "doc_id", "tok", budget = 256, buckets = 8)
        .orderBy("doc_id"),
      Some(s"""WITH RECURSIVE sp AS (
          SELECT doc_id,
            CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS BIGINT) AS tok
          FROM documents),
        ${packOracleCtes("sp")}
        SELECT doc_id, bucket, seq FROM packed ORDER BY doc_id""")),

    GQuery("emb_quantize",
      (s, d) => {
        val e = T.embeddings(s, d)
          .withColumn("q", quantizeInt8(col("embedding")))
        e.select(col("vec_id"), posexplode(col("q")))
          .select(col("vec_id"), (col("pos") + 1).as("dim"), col("col").as("q"))
          .orderBy("vec_id", "dim")
      },
      Some("""WITH e AS (SELECT vec_id, embedding,
            list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS m
          FROM embeddings)
        SELECT vec_id, CAST(i AS INT) AS dim,
          CASE WHEN m = 0 THEN 0
               ELSE CAST(floor(CAST(embedding[i] AS DOUBLE) * 127.0 / m) AS BIGINT)
          END AS q
        FROM e, unnest(generate_series(1, len(embedding))) AS s(i)
        ORDER BY vec_id, dim"""))
  )
}
