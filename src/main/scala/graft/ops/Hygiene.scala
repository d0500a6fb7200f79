package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
    T.spreadSmall(docs)
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
    T.spreadSmall(docs)
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
    val tok = T.spreadSmall(docs)
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

  /** Bigram-LM cross-entropy score: each document's average negative
    * log-likelihood under an add-one-smoothed bigram model trained on
    * the corpus itself — the perplexity-filter signal (CCNet/KenLM
    * style) with the model-training step IN the engine: P(w₂|w₁) =
    * (c(w₁w₂)+1)/(c(w₁)+V). Low avg_nll = stock phrasing the corpus has
    * seen many times; high = unusual token transitions. Complements
    * [[rarityScore]] (unigram, context-free) with the conditional
    * signal that catches fluent-but-rare vs degenerate-but-common text.
    *
    * Scale: two vocabulary-scale count aggs (map-side combined), then
    * an equi-join of per-doc bigram multisets against them — the
    * TF-IDF/BM25 inverted shape, corpus never cross-joins. V rides
    * along as a broadcast single-row agg, not a driver collect. Floats:
    * ln is libm-portable at the 3-decimal rounding this emits (the
    * doc_tfidf_topk precedent); counts and V are exact integers so both
    * engines feed ln identical doubles.
    */
  def lmScore(docs: DataFrame): DataFrame = {
    val tok = docs
      .withColumn("_tk", expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)"))
    val uni = tok.select(explode(col("_tk")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cu"))
    val vsz = uni.agg(count(lit(1)).as("vsz"))
    val bi = tok.filter(size(col("_tk")) >= 2)
      .select(col("doc_id"), explode(expr(Text.ngramExpr("_tk", 2))).as("bg"))
    val db = bi.groupBy(col("doc_id"), col("bg")).agg(count(lit(1)).as("c"))
      .withColumn("w1", split(col("bg"), " ").getItem(0))
    db.join(bi.groupBy("bg").agg(count(lit(1)).as("cb")), "bg")
      .join(uni.withColumnRenamed("w", "w1"), "w1")
      .crossJoin(broadcast(vsz))
      .withColumn("lp",
        log((col("cb") + lit(1)).cast("double") / (col("cu") + col("vsz"))))
      .groupBy("doc_id")
      .agg(sum(col("c")).as("n_bigrams"),
        round(-sum(col("c") * col("lp")) / sum(col("c")), 3).as("avg_nll"))
  }

  /** DSIR-style importance weights (Xie et al. 2023, "Data Selection
    * for Language Models via Importance Resampling"): score every RAW
    * document by how target-like its hashed-bigram profile is,
    * logw = Σ_features c·(ln P_target(f) − ln P_raw(f)), with bigrams
    * hashed into `buckets` features (the portable md5-prefix hash the
    * MinHash family uses — no cross-engine hash to disagree on) and
    * add-one smoothing on both models. Downstream, resampling keeps
    * raw docs with probability ∝ exp(logw) — the principled way to
    * tilt a 100 TB crawl toward a curated target mix without training
    * a classifier.
    *
    * Scale: both models are B-bucket count vectors (vocabulary-
    * COLLAPSED — the hash bounds model size at `buckets` regardless of
    * corpus vocabulary), built in one map-side-combined agg each; the
    * per-doc score re-joins on the bucket id. Corpus never
    * cross-joins, and the model join key has at most `buckets`
    * distinct values, so the shuffle is bounded.
    */
  def dsirWeights(docs: DataFrame, targetPred: Column,
                  buckets: Int = 4096): DataFrame = {
    // ONE tokenize+explode pass, collapsed immediately to per-
    // (side, doc, bucket) counts. The previous shape derived the target
    // model (tc), raw model (rc), both totals (tn, rn) and the per-doc
    // counts (db) as FIVE independent subtrees of the same exploded-gram
    // plan — five corpus tokenizations per run (Catalyst shares no
    // subtree without identical exchanges). Here everything downstream
    // folds from `db0`: the two bucket models roll up in one agg, their
    // corpus totals attach via a single-partition window over ≤ `buckets`
    // rows (bounded by construction — never corpus-sized), and the
    // per-doc side is a filter of the same frame. Two db0 evaluations
    // remain (model side, per-doc side). Measured sf0.1 (local[32]):
    // wall-clock is FLAT (the five subtrees ran as concurrent stages, so
    // the fixture never paid 5x latency) but total work drops 5 → 2
    // corpus tokenizations — the number that matters when the corpus,
    // not the cluster, is the big term.
    val g = docs
      .withColumn("_tk", expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)"))
      .filter(size(col("_tk")) >= 2)
      .select(col("doc_id"), targetPred.as("is_t"),
        explode(expr(Text.ngramExpr("_tk", 2))).as("bg"))
      .withColumn("b",
        conv(substring(md5(col("bg")), 1, 7), 16, 10).cast("long") % buckets)
    val db0 = g.groupBy(col("is_t"), col("doc_id"), col("b"))
      .agg(count(lit(1)).as("c"))
    // bucket models, both sides in one rollup: ct/cr = per-bucket gram
    // counts of the target/raw corpus (0 where a side missed the bucket,
    // matching the old left-join + na.fill contract)
    val models = db0.groupBy(col("b")).agg(
      sum(when(col("is_t"), col("c")).otherwise(0L)).as("ct"),
      sum(when(!col("is_t"), col("c")).otherwise(0L)).as("cr"))
    // corpus totals ride a whole-frame window over the ≤ `buckets`-row
    // model table instead of two more full-plan aggregates
    val tot = org.apache.spark.sql.expressions.Window.rowsBetween(
      org.apache.spark.sql.expressions.Window.unboundedPreceding,
      org.apache.spark.sql.expressions.Window.unboundedFollowing)
    val withTot = models
      .withColumn("nt", sum(col("ct")).over(tot))
      .withColumn("nr", sum(col("cr")).over(tot))
    db0.filter(!col("is_t")).select(col("doc_id"), col("b"), col("c"))
      .join(withTot, "b") // raw docs' own buckets always have cr >= 1
      // fail fast on an empty TARGET partition: zero target grams means
      // the importance model is undefined, not that every weight is
      // unknown (ADVICE r10). The raw side needs no guard: every output
      // row descends from a raw-doc bucket join, so "no raw rows" yields
      // the EMPTY result — the correct answer, not a silent failure.
      .withColumn("nt", when(col("nt") <= 0L, raise_error(lit(
        "dsirWeights: targetPred matched no rows — importance weights undefined")))
        .otherwise(col("nt")))
      .withColumn("lr",
        log((col("ct") + lit(1)).cast("double") / (col("nt") + lit(buckets))) -
        log((col("cr") + lit(1)).cast("double") / (col("nr") + lit(buckets))))
      .groupBy("doc_id")
      .agg(sum(col("c")).as("n_grams"),
        round(sum(col("c") * col("lr")), 3).as("logw"))
  }

  /** Exact duplicated-substring spans (Lee et al. 2021, "Deduplicating
    * Training Data Makes Language Models Better" — the suffix-array
    * signal, re-expressed relationally): a position is duplicated when
    * its `n`-token gram occurs ≥ 2 times corpus-wide (cross-doc OR
    * within-doc); maximal runs of consecutive duplicated positions are
    * recovered with the gaps-and-islands trick (p − row_number() is
    * constant within a run), and a run of r grams covers r+n−1 tokens.
    * Returns every ≥n-token doc with its gram count, duplicated-gram
    * count, and longest duplicated span — the inputs to the usual
    * "cut spans ≥ 50 tokens" policy.
    *
    * Scale: the duplicate set is a vocabulary-scale agg (map-side
    * combined, never pairwise); the islands window partitions BY
    * DOCUMENT, so its sort is bounded by doc length, not corpus size.
    * A suffix array finds duplicates at any length in O(corpus) but
    * doesn't shard; fixing the probe length n makes the whole signal
    * an inverted-index problem that does.
    */
  def dupSpans(docs: DataFrame, n: Int = 8): DataFrame = {
    val tok = docs
      .withColumn("_tk", expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)"))
      .filter(size(col("_tk")) >= n)
    val grams = tok.select(col("doc_id"),
      posexplode(expr(Text.ngramExpr("_tk", n))).as(Seq("p", "gram")))
    val dup = grams.groupBy("gram").agg(count(lit(1)).as("occ"))
      .filter(col("occ") >= 2).select("gram")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("p"))
    val islands = grams.join(dup, "gram")
      .withColumn("grp", col("p") - row_number().over(w))
      .groupBy(col("doc_id"), col("grp")).agg(count(lit(1)).as("run"))
      .groupBy(col("doc_id"))
      .agg(sum(col("run")).as("n_dup_grams"),
        (max(col("run")) + lit(n - 1)).as("max_dup_span"))
    tok.select(col("doc_id"),
        (size(col("_tk")) - lit(n - 1)).cast("long").as("n_grams"))
      .join(islands, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_grams"),
        coalesce(col("n_dup_grams"), lit(0L)).as("n_dup_grams"),
        coalesce(col("max_dup_span"), lit(0L)).as("max_dup_span"))
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

  /** ONE definition of the DSIR scoring CTE chain (hashed-bigram
    * target/raw likelihood ratios, ending at sc(doc_id, c, lr)) shared
    * by the weight and resample oracles — the two must agree on the
    * exact model or a smoothing change would silently desynchronize
    * them. Declared before `queries` (oracle-string init-order rule).
    */
  private val dsirCtes =
    """tk AS (SELECT doc_id,
                regexp_extract_all(lower(text), '[a-z0-9]+') AS t
              FROM documents),
           g0 AS (SELECT doc_id, array_to_string(list_slice(t, i, i + 1), ' ') AS bg
                  FROM tk, unnest(generate_series(1, len(t) - 1)) s(i)
                  WHERE len(t) >= 2),
           g AS (SELECT doc_id, doc_id % 5 = 0 AS is_t,
                   CAST(('0x' || substr(md5(bg), 1, 7)) AS BIGINT) % 4096 AS b
                 FROM g0),
           tc AS (SELECT b, count(*) AS ct FROM g WHERE is_t GROUP BY 1),
           rc AS (SELECT b, count(*) AS cr FROM g WHERE NOT is_t GROUP BY 1),
           tn AS (SELECT CAST(count(*) AS BIGINT) AS nt FROM g WHERE is_t),
           rn AS (SELECT CAST(count(*) AS BIGINT) AS nr FROM g WHERE NOT is_t),
           db AS (SELECT doc_id, b, count(*) AS c FROM g WHERE NOT is_t
                  GROUP BY 1, 2),
           sc AS (SELECT db.doc_id, db.c,
                    ln((coalesce(tc.ct, 0) + 1) / (tn.nt + 4096)) -
                    ln((rc.cr + 1) / (rn.nr + 4096)) AS lr
                  FROM db LEFT JOIN tc USING (b) JOIN rc USING (b)
                  CROSS JOIN tn CROSS JOIN rn)"""

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

    GQuery("doc_lm_score",
      (s, d) => lmScore(T.documents(s, d)).orderBy("doc_id"),
      Some("""WITH tk AS (SELECT doc_id,
                regexp_extract_all(lower(text), '[a-z0-9]+') AS t
              FROM documents),
           u AS (SELECT unnest(t) AS w FROM tk),
           uni AS (SELECT w, count(*) AS cu FROM u GROUP BY 1),
           v AS (SELECT count(*) AS vsz FROM uni),
           g AS (SELECT doc_id, array_to_string(list_slice(t, i, i + 1), ' ') AS bg,
                        t[i] AS w1
                 FROM tk, unnest(generate_series(1, len(t) - 1)) s(i)
                 WHERE len(t) >= 2),
           bc AS (SELECT bg, count(*) AS cb FROM g GROUP BY 1),
           db AS (SELECT doc_id, bg, w1, count(*) AS c FROM g GROUP BY 1, 2, 3),
           sc AS (SELECT db.doc_id, db.c,
                    ln((bc.cb + 1) / (uni.cu + v.vsz)) AS lp
                  FROM db JOIN bc USING (bg)
                  JOIN uni ON uni.w = db.w1 CROSS JOIN v)
        SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bigrams,
          round(-sum(c * lp) / sum(c), 3) AS avg_nll
        FROM sc GROUP BY doc_id ORDER BY doc_id""")),

    // target mix = every 5th doc — the fixture stand-in for a curated
    // quality sample; raw = the rest, each scored for target-likeness
    GQuery("doc_dsir_weight",
      (s, d) => dsirWeights(T.documents(s, d),
        pmod(col("doc_id"), lit(5L)) === 0L).orderBy("doc_id"),
      Some(s"""WITH $dsirCtes
        SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_grams,
          round(sum(c * lr), 3) AS logw
        FROM sc GROUP BY doc_id ORDER BY doc_id""")),

    // ---- DSIR resampling (the SELECTION step of Xie et al. 2023) ------
    // Gumbel-top-k sampling-without-replacement over the importance
    // weights: each raw doc gets key = logw + Gumbel(u) with u a
    // content-hash uniform (no RNG — deterministic and replayable), and
    // the top 20% by key form the resampled corpus. All ranking inputs
    // are the agreed ROUNDED weights plus a rounded key, the float
    // contract every scored oracle here uses. Scale shape: weights are
    // the bounded-join dsir plan; the selection adds one window rank —
    // at 100 TB the global rank becomes a range-partitioned total sort
    // (the doc_shuffle design), never a single-partition window.
    GQuery("doc_dsir_sample",
      (s, d) => {
        val w = dsirWeights(T.documents(s, d),
          pmod(col("doc_id"), lit(5L)) === 0L)
        val u = (conv(substring(md5(concat(col("doc_id").cast("string"),
          lit(":dsir"))), 1, 7), 16, 10).cast("double") + lit(0.5)) /
          lit(268435456.0)
        val keyed = w.withColumn("key",
          round(col("logw") + -log(-log(u)), 3))
        // top-fraction via sort+limit (TakeOrderedAndProject): the
        // DISTRIBUTED top-k physical operator — never a global
        // single-partition row_number window, which would pull the
        // whole corpus through one task at scale. The limit needs the
        // weighted-row count, which equals the raw-doc count with >= 2
        // tokens (every such doc contributes bigrams) — one cheap base
        // scan, so the expensive scoring plan evaluates ONCE, in the
        // sort itself (counting `keyed` would run it twice).
        val n = T.documents(s, d)
          .filter(!(pmod(col("doc_id"), lit(5L)) === 0L))
          .filter(size(expr(
            "regexp_extract_all(lower(text), '[a-z0-9]+', 0)")) >= 2)
          .count()
        keyed.orderBy(col("key").desc, col("doc_id"))
          .limit(math.ceil(n * 0.2).toInt)
          .select(col("doc_id"), col("logw"), col("key"))
          .orderBy("doc_id")
      },
      Some(s"""WITH $dsirCtes,
        w AS (SELECT doc_id, round(sum(c * lr), 3) AS logw
              FROM sc GROUP BY doc_id),
        k AS (SELECT doc_id, logw,
                round(logw + -ln(-ln(
                  (CAST(('0x' || substr(md5(doc_id::VARCHAR || ':dsir'), 1, 7)) AS BIGINT)
                    + 0.5) / 268435456.0)), 3) AS key
              FROM w),
        r AS (SELECT *, row_number() OVER (ORDER BY key DESC, doc_id) AS rn,
                count(*) OVER () AS n
              FROM k)
        SELECT doc_id, logw, key FROM r
        WHERE rn <= ceil(n * 0.2) ORDER BY doc_id""")),

    GQuery("doc_dup_spans",
      (s, d) => dupSpans(T.documents(s, d), n = 8).orderBy("doc_id"),
      Some("""WITH tk AS (SELECT doc_id,
                regexp_extract_all(lower(text), '[a-z0-9]+') AS t
              FROM documents),
           g AS (SELECT doc_id, i - 1 AS p,
                   array_to_string(list_slice(t, i, i + 7), ' ') AS gram
                 FROM tk, unnest(generate_series(1, len(t) - 7)) s(i)
                 WHERE len(t) >= 8),
           oc AS (SELECT gram FROM g GROUP BY gram HAVING count(*) >= 2),
           d AS (SELECT g.doc_id, g.p,
                   row_number() OVER (PARTITION BY g.doc_id ORDER BY g.p) AS rn
                 FROM g JOIN oc USING (gram)),
           isl AS (SELECT doc_id, p - rn AS grp, count(*) AS run
                   FROM d GROUP BY 1, 2),
           agg AS (SELECT doc_id, CAST(sum(run) AS BIGINT) AS n_dup_grams,
                     CAST(max(run) + 7 AS BIGINT) AS max_dup_span
                   FROM isl GROUP BY 1),
           base AS (SELECT doc_id, CAST(len(t) - 7 AS BIGINT) AS n_grams
                    FROM tk WHERE len(t) >= 8)
        SELECT b.doc_id, b.n_grams,
          coalesce(a.n_dup_grams, 0) AS n_dup_grams,
          coalesce(a.max_dup_span, 0) AS max_dup_span
        FROM base b LEFT JOIN agg a USING (doc_id) ORDER BY doc_id""")),

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
