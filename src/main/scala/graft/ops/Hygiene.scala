package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{GQuery, Tables => T}

/** Corpus-hygiene operators for training pipelines: benchmark
  * decontamination (n-gram overlap against a held-out set) and
  * repetition scoring (the degenerate-text signal used by every quality
  * filter since C4/Gopher).
  *
  * Both follow the inverted-index discipline of the dedup family (see
  * ops/Text): overlap is an EQUI-join on the n-gram key — vocabulary-
  * scale shuffle, zipf-skewed (AQE skew split applies), never a
  * cross-join — and repetition is a per-doc aggregate with map-side
  * combine. No UDFs; everything stays in whole-stage codegen.
  */
object Hygiene {

  /** distinct word n-grams per document: (doc_id, gram). Documents
    * shorter than `n` tokens contribute nothing (they cannot carry an
    * n-gram). The explicit length filter matters: Spark's `sequence(1,
    * x)` with x <= 0 counts DOWN, it does not return empty.
    */
  private[ops] def docGrams(docs: DataFrame, n: Int): DataFrame =
    docs
      .withColumn("_tk", expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)"))
      .filter(size(col("_tk")) >= n)
      // zip_with n-gram shape, NOT transform-with-index: see
      // Text.ngramExpr for the 11x CollapseProject-inlining hazard
      .select(col("doc_id"), explode(expr(Text.ngramExpr("_tk", n))).as("gram"))
      .distinct()

  /** Benchmark decontamination: for each training document, how many
    * distinct `n`-grams it shares with the benchmark corpus and with how
    * many benchmark documents. Pipelines drop or mask hits — training on
    * eval data is the one contamination nobody can filter after the
    * fact. Returns (doc_id, n_shared_grams, n_benchmark_docs), hit docs
    * only.
    */
  def contamination(train: DataFrame, benchmark: DataFrame, n: Int = 8): DataFrame = {
    val tg = docGrams(train, n)
    val bg = docGrams(benchmark, n)
      .withColumnRenamed("doc_id", "bench_doc_id")
    tg.join(bg, "gram")
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("gram")).as("n_shared_grams"),
        countDistinct(col("bench_doc_id")).as("n_benchmark_docs"))
  }

  /** Repetition score: per document, the total trigram count and the
    * multiplicity of its MOST repeated trigram. `top_count / n_trigrams`
    * near 1 is boilerplate/degenerate text; emitting the two exact
    * integers (not the float ratio) keeps the result engine-exact and
    * lets the caller pick the threshold.
    */
  def repetition(docs: DataFrame, n: Int = 3): DataFrame =
    docs
      .withColumn("_tk", expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)"))
      .filter(size(col("_tk")) >= n)
      .select(col("doc_id"), explode(expr(Text.ngramExpr("_tk", n))).as("gram"))
      .groupBy(col("doc_id"), col("gram")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_ngrams"), max(col("c")).as("top_count"))

  // ---- fixture queries ------------------------------------------------
  // benchmark set = every 50th doc_id (a held-out 2% "eval suite") PLUS
  // planted contamination: the text of every doc_id % 7 == 3 training
  // doc re-appears as a benchmark entry (id+1000000) — so the query
  // PROVES detection with guaranteed hits at every SF instead of
  // relying on whatever natural overlap the fixture happens to contain
  // (1 natural hit at sf0.01 — too weak a signal on its own).

  private def bench(s: SparkSession, d: String) = {
    val docs = T.documents(s, d)
    docs.filter(pmod(col("doc_id"), lit(50)) === 0)
      .unionByName(docs
        .filter(pmod(col("doc_id"), lit(50)) =!= 0 &&
          pmod(col("doc_id"), lit(7)) === 3)
        .withColumn("doc_id", col("doc_id") + 1000000L))
  }

  private def train(s: SparkSession, d: String) =
    T.documents(s, d).filter(pmod(col("doc_id"), lit(50)) =!= 0)

  private val gramCte =
    """tk AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t
              FROM documents),
       g AS (SELECT DISTINCT doc_id, array_to_string(list_slice(t, i, i + 7), ' ') AS gram
             FROM tk, unnest(generate_series(1, len(t) - 7)) s(i)
             WHERE len(t) >= 8)"""

  /** Unigram-LM-flavored rarity score: each token contributes
    * floor(10⁹ / ctf) where ctf is its corpus collection frequency, and
    * the document score is the floor-mean of its tokens' contributions.
    * High = rare/unusual vocabulary, low = stock phrasing — the exact-
    * integer stand-in for "unigram negative log likelihood" that every
    * quality-filtering recipe ranks on (KenLM-style scoring without a
    * float surface: integer division has ONE rule everywhere, so the
    * score is engine-exact and oracle-checkable, where avg(-ln p) would
    * ride libm's last ulp).
    *
    * Scale: the token→ctf map is vocabulary-scale (map-side combined
    * agg), the re-join is an equi-join on the token — the same inverted
    * shape as TF-IDF/BM25; the corpus never cross-joins.
    */
  def rarityScore(docs: DataFrame): DataFrame = {
    val tok = docs
      .withColumn("_tk", expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)"))
      .filter(size(col("_tk")) >= 1)
      .select(col("doc_id"), explode(col("_tk")).as("t"))
    val ctf = tok.groupBy("t").agg(count(lit(1)).as("ctf"))
    tok.join(ctf, "t")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        // `div` = exact integer division (one rule in every engine —
        // the double-division route could round up across a floor
        // boundary once ctf outgrows the double gap argument)
        floor(sum(expr("1000000000L div ctf")) / count(lit(1)))
          .as("rarity_x1e9"))
  }

  /** Trigram novelty: the floor-scaled share of a document's DISTINCT
    * trigrams that occur in no other document — the dual of the
    * boilerplate signal (doc_boilerplate_strip): high novelty = unique
    * content worth keeping, near-zero = the document is assembled from
    * corpus-common phrasing. Same inverted-index shape as contamination:
    * gram df is a vocabulary-scale agg, never a pairwise comparison.
    */
  def novelty(docs: DataFrame, n: Int = 3): DataFrame = {
    val grams = docGrams(docs, n)
    val df_ = grams.groupBy("gram").agg(count(lit(1)).as("df"))
    grams.join(df_, "gram")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("df") === 1, 1L).otherwise(0L)).as("n_unique"),
        floor(sum(when(col("df") === 1, 1L).otherwise(0L)) * lit(10000L)
          / count(lit(1))).as("novelty_x10k"))
  }

  val queries: Seq[GQuery] = Seq(

    GQuery("doc_rarity_score",
      (s, d) => rarityScore(T.documents(s, d)).orderBy("doc_id"),
      Some("""WITH tk AS (SELECT doc_id,
                unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS t
              FROM documents),
           ctf AS (SELECT t, count(*) AS ctf FROM tk GROUP BY 1)
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
          CAST(floor(sum(1000000000 // ctf) / count(*)) AS BIGINT) AS rarity_x1e9
        FROM tk JOIN ctf USING (t)
        GROUP BY doc_id ORDER BY doc_id""")),

    GQuery("doc_novelty",
      (s, d) => novelty(T.documents(s, d), n = 3).orderBy("doc_id"),
      Some("""WITH tk AS (SELECT doc_id,
                regexp_extract_all(lower(text), '[a-z0-9]+') AS t
              FROM documents),
           g AS (SELECT DISTINCT doc_id, array_to_string(list_slice(t, i, i + 2), ' ') AS gram
             FROM tk, unnest(generate_series(1, len(t) - 2)) s(i)
             WHERE len(t) >= 3),
           d AS (SELECT gram, count(*) AS df FROM g GROUP BY 1)
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams,
          CAST(sum(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_unique,
          CAST(floor(sum(CASE WHEN df = 1 THEN 1 ELSE 0 END) * 10000.0 / count(*)) AS BIGINT)
            AS novelty_x10k
        FROM g JOIN d USING (gram)
        GROUP BY doc_id ORDER BY doc_id""")),

    GQuery("doc_contamination",
      (s, d) => contamination(train(s, d), bench(s, d), n = 8)
        .orderBy("doc_id"),
      Some(s"""WITH $gramCte,
           b AS (SELECT doc_id AS bench_doc_id, gram FROM g WHERE doc_id % 50 = 0
                 UNION ALL
                 SELECT doc_id + 1000000 AS bench_doc_id, gram FROM g
                 WHERE doc_id % 50 <> 0 AND doc_id % 7 = 3),
           tr AS (SELECT doc_id, gram FROM g WHERE doc_id % 50 <> 0)
        SELECT tr.doc_id,
          CAST(count(DISTINCT tr.gram) AS BIGINT) AS n_shared_grams,
          CAST(count(DISTINCT b.bench_doc_id) AS BIGINT) AS n_benchmark_docs
        FROM tr JOIN b USING (gram)
        GROUP BY tr.doc_id ORDER BY tr.doc_id""")),

    GQuery("doc_repetition",
      (s, d) => repetition(T.documents(s, d), n = 3).orderBy("doc_id"),
      Some("""WITH tk AS (SELECT doc_id,
                regexp_extract_all(lower(text), '[a-z0-9]+') AS t
              FROM documents),
           g AS (SELECT doc_id, array_to_string(list_slice(t, i, i + 2), ' ') AS gram
             FROM tk, unnest(generate_series(1, len(t) - 2)) s(i)
             WHERE len(t) >= 3),
           c AS (SELECT doc_id, gram, count(*) AS c FROM g GROUP BY 1, 2)
        SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_ngrams,
          CAST(max(c) AS BIGINT) AS top_count
        FROM c GROUP BY doc_id ORDER BY doc_id"""))
  )
}
