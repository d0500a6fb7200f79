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
      .withColumn("start",
        explode(expr(s"sequence(1, greatest(size(_tk), 1), $stride)")))
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
    transform(emb, x =>
      when(m === 0.0, 0L)
        .otherwise(floor(x.cast("double") * lit(127.0) / m)))
  }

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
        FROM d, unnest(generate_series(1, greatest(len(tk), 1), 30)) AS s(i)
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
