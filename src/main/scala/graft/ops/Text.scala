package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.{GQuery, Tables => T}

/** Text-analysis + deduplication operators over the `documents` fixture
  * (SURVEY.md §2.6; BASELINE.json north star: "dedup, text analysis").
  *
  * 100 TB design notes:
  *  - Everything is built from codegen'd `functions._`/higher-order
  *    functions — no Scala UDFs in these paths, so whole-stage codegen
  *    holds and columns prune to (doc_id, text).
  *  - Near-dup detection uses the inverted-index shingle join (exact
  *    Jaccard) and MinHash+LSH banding (candidate generation) — the two
  *    standard shapes that scale: both shuffle on shingle/band keys, never
  *    cross-join the corpus.
  */
object Text {

  /** whitespace tokens of the lower-cased text */
  private[graft] val toks: Column = split(lower(trim(col("text"))), "\\s+")

  /** Word n-gram array via ITERATED zip_with over offset slices — NOT
    * `transform(sequence(...), i -> ...tk[i]...)`. The reason is an
    * optimizer hazard, measured 11x: when the token array is itself a
    * computed expression (split of the text), CollapseProject inlines
    * that computation into every `tk[i]` REFERENCE INSIDE THE LAMBDA, so
    * each of the n references per element re-tokenizes the whole
    * document — O(tokens²) work per row. Here every `tk` reference sits
    * OUTSIDE the lambdas (zip_with/slice arguments, evaluated once per
    * row), so the shape is inlining-proof by construction. Documents
    * with < n tokens yield the empty array (sequence(0, negative) would
    * otherwise count DOWN; zip_with would null-pad).
    */
  private[ops] def ngramExpr(tk: String, n: Int): String = {
    val joined = (2 to n).foldLeft(tk) { (acc, i) =>
      s"zip_with($acc, slice($tk, $i, size($tk) - ${i - 1}), (a, b) -> concat_ws(' ', a, b))"
    }
    s"""CASE WHEN size($tk) >= $n THEN slice($joined, 1, size($tk) - ${n - 1})
        ELSE CAST(array() AS array<string>) END"""
  }

  /** distinct word-trigram shingles (empty set below 3 tokens) */
  private[graft] val triExpr = s"array_distinct(${ngramExpr("tk", 3)})"

  /** (doc_id, shingle) exploded inverted-index input + per-doc set size.
    * The scan spreads to cluster parallelism first (Tables.spreadSmall):
    * tokenize + shingle explode is the expensive pre-exchange stage, and
    * a compact corpus reads as 1–3 splits, pinning it to as many cores
    * (measured r18: doc_ngram_jaccard_pairs 2.99 → 1.56 s at sf0.1). */
  private def shingledFrom(documents: DataFrame): (DataFrame, DataFrame) = {
    val tri = T.spreadSmall(documents)
      .withColumn("tk", toks)
      .select(col("doc_id"), explode(expr(triExpr)).as("sh"))
    val sizes = tri.groupBy("doc_id").agg(count(lit(1)).as("n"))
    (tri, sizes)
  }


  /** exact-Jaccard pairs via inverted-index join, filtered at `minJ`.
    * (A df>1 shingle prefilter was measured and REJECTED here: the
    * fixture's small vocabulary makes nearly every shingle shared, so the
    * extra aggregation+join cost ~60% with no join shrinkage. On diverse
    * real text, where most shingles are unique, it pays — revisit if the
    * corpus changes.)
    */
  private[graft] def jaccardPairsFrom(documents: DataFrame, minJ: Double): DataFrame = {
    val (tri, sizes) = shingledFrom(documents)
    val a = tri.as("a"); val b = tri.as("b")
    a.join(b, col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("inter"))
      .join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n", "na"), "doc_a")
      .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n", "nb"), "doc_b")
      .withColumn("jaccard", round(col("inter") / (col("na") + col("nb") - col("inter")), 4))
      .filter(col("jaccard") >= minJ)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  private def jaccardPairs(s: SparkSession, d: String, minJ: Double): DataFrame =
    jaccardPairsFrom(T.documents(s, d), minJ)

  /** Exact-Jaccard pairs with PREFIX FILTERING (Bayardo et al. WWW'07
    * "All Pairs"; Vernica et al. SIGMOD'10 for the distributed form):
    * under any global shingle order, two sets with J ≥ t must share an
    * element in their first |x| − ⌈t·|x|⌉ + 1 shingles, so only that
    * prefix enters the inverted-index self-join. Ordering shingles
    * rarest-first keeps high-frequency shingles OUT of prefixes — the
    * hot-key quadratic blowup of the plain shingle join (its true scale
    * hazard on a diverse corpus) never materializes. Candidates are then
    * verified exactly against the full shingle arrays (codegen'd
    * array_intersect, no second exploded shuffle). Identical results to
    * the naive join by construction (prefix filtering admits no false
    * negatives; TextSimilaritySpec pins equality on randomized corpora
    * and the measured A/B on the fixture printed diff_rows=0).
    *
    * NOT the fixture query path, by measurement: on the driver corpus
    * (tiny shared vocabulary — even the rarest shingle of a doc is hot)
    * the candidate set approaches all-pairs and the extra
    * distinct+verify machinery loses 11× (34.6 s vs 3.0 s, sf0.1
    * local[32]); the naive inverted join wins whenever nearly every
    * shingle is shared. On diverse real text (most shingles rare) the
    * candidate set collapses and this is the shape that survives scale —
    * the same corpus-statistics tradeoff recorded at `jaccardPairs`
    * (its df>1 prefilter note). Choose per corpus: high shingle-reuse →
    * naive; long-tail vocabulary → prefix.
    */
  def jaccardPairsPrefix(documents: DataFrame, minJ: Double): DataFrame = {
    val docs = T.spreadSmall(documents).withColumn("tk", toks)
      .select(col("doc_id"), expr(triExpr).as("shs"))
      .withColumn("n", size(col("shs")))
      .filter(col("n") > 0)
    val tri = docs.select(col("doc_id"), col("n"), explode(col("shs")).as("sh"))
    val freq = tri.groupBy("sh").agg(count(lit(1)).as("df"))
    // ε guards the exactness contract against binary floating point:
    // t·n can land a hair ABOVE its true value (e.g. 100×0.07 =
    // 7.000000000000001), which would shorten the prefix below the
    // lemma's bound and over-prune the length filter — silent false
    // negatives at J exactly minJ. Relaxing by ε only ADMITS candidates
    // (the exact verification below discards extras), never drops one.
    val eps = 1e-9
    // per-doc window: rank shingles rarest-first; keep the filter prefix
    val byDoc = Window.partitionBy("doc_id").orderBy(col("df"), col("sh"))
    val prefix = tri.join(freq, "sh")
      .withColumn("r", row_number().over(byDoc))
      .filter(col("r") <= col("n") - ceil(col("n") * minJ - eps) + 1)
      .select(col("doc_id"), col("n"), col("sh"))
    // candidate ids only — the length filter (t·na ≤ nb ≤ na/t) prunes
    // before the distinct; shingle strings never enter the pair shuffle
    val cand = prefix.as("a").join(prefix.as("b"),
        col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id") &&
          col("b.n") >= col("a.n") * minJ - eps &&
          col("a.n") >= col("b.n") * minJ - eps)
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    cand
      .join(docs.select(col("doc_id").as("doc_a"), col("shs").as("sa"),
        col("n").as("na")), "doc_a")
      .join(docs.select(col("doc_id").as("doc_b"), col("shs").as("sb"),
        col("n").as("nb")), "doc_b")
      .withColumn("inter", size(array_intersect(col("sa"), col("sb"))))
      .withColumn("jaccard",
        round(col("inter") / (col("na") + col("nb") - col("inter")), 4))
      .filter(col("jaccard") >= minJ)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  /** Corpus-statistics-driven dispatch between the two exact-Jaccard
    * join forms (the optimizer decision a 100 TB engine must make
    * itself — the manual, measured tradeoff recorded at [[jaccardPairsFrom]]
    * vs [[jaccardPairsPrefix]] becomes a probe + rule):
    *
    * Statistic: the fraction of shingle POSTING MASS sitting in df=1
    * shingles, from one vocabulary-scale agg over a deterministic 1/`sampleMod`
    * doc sample (content-hash bucket, no RNG — same sampling contract as
    * [[Sampling]]). df=1 postings are exactly the inverted join's dead
    * weight (they can never produce a candidate pair), and on a
    * rare-dominated corpus the rarest-first prefixes are df=1-populated,
    * so candidates collapse and prefix wins; on a shared-vocabulary
    * corpus (the fixture at sf0.1: median df 9, rare mass < 0.1%) every
    * prefix shingle is hot, prefix prunes nothing, and its extra
    * agg+window+verify machinery loses 11× (measured, see
    * [[jaccardPairsPrefix]]). Threshold 0.5 = "is most of the shuffle
    * useful work?"; doc sampling at 1/4 biases df DOWN (a df-d shingle's
    * sampled posting is lonely w.p. (3/4)^(d-1) ≈ 0.10 at the fixture's
    * d≈9), which the margin on both regimes absorbs — measured: fixture
    * sf0.1 samples to ~0.15 → naive; a boilerplate-over-unique-text
    * corpus stays ≥ 0.8 → prefix.
    *
    * Both forms return IDENTICAL pairs (TextSimilaritySpec pins it), so
    * the dispatch changes cost, never results — which is what lets
    * `doc_ngram_jaccard_pairs` route through it with an unchanged oracle.
    */
  private[graft] def chooseJaccardForm(documents: DataFrame, sampleMod: Int = 4): String = {
    val sampled =
      if (sampleMod <= 1) documents
      else documents.filter(pmod(
        conv(substring(md5(concat(col("doc_id").cast("string"), lit(":jform"))), 1, 8), 16, 10)
          .cast("long"), lit(sampleMod.toLong)) === 0)
    val (tri, _) = shingledFrom(sampled)
    val row = tri.groupBy("sh").agg(count(lit(1)).as("df"))
      .agg(sum(col("df")).as("p"),
        sum(when(col("df") === 1, 1L).otherwise(0L)).as("rare"))
      .collect()(0)
    if (row.isNullAt(0) || row.getLong(0) == 0L) "naive" // empty probe: cheap default
    else if (row.getLong(1).toDouble / row.getLong(0) >= 0.5) "prefix"
    else "naive"
  }

  /** the ONE decision point mapping a chosen form to its join */
  private def jaccardPairsByForm(form: String, documents: DataFrame,
      minJ: Double): DataFrame =
    if (form == "prefix") jaccardPairsPrefix(documents, minJ)
    else jaccardPairsFrom(documents, minJ)

  /** exact-Jaccard pairs through the [[chooseJaccardForm]] dispatch */
  def jaccardPairsAuto(documents: DataFrame, minJ: Double,
      sampleMod: Int = 4): DataFrame =
    jaccardPairsByForm(chooseJaccardForm(documents, sampleMod), documents, minJ)

  /** fixture-path memo: the probe is a one-time-per-corpus decision, so
    * the catalog entry resolves it once per sf dir (the same memo
    * contract as the index caches) */
  private val jFormCache = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def jaccardFormFor(s: SparkSession, d: String): String =
    jFormCache.computeIfAbsent(d, _ => chooseJaccardForm(T.documents(s, d)))

  /** Connected components over the near-duplicate pair graph via
    * min-label propagation: every document gets `cluster_id` = smallest
    * doc_id in its component — the step that turns PAIRWISE near-dup
    * detection into keep-one-per-cluster dedup. Each iteration is one
    * join+groupBy shuffle keyed on doc id (the GraphX CC shape without
    * the library) and the loop runs O(component diameter) iterations;
    * dup-pair graphs are overwhelmingly tiny cliques and short chains,
    * so convergence takes a handful of passes regardless of corpus
    * size. Convergence is detected with a limit(1) probe, not a full
    * count.
    */
  private[graft] def dupClusters(pairs: DataFrame): DataFrame = {
    val edges = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .union(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .persist()
    var labels = edges.select(col("src").as("doc_id")).distinct()
      .withColumn("cluster_id", col("doc_id")).persist()
    try {
      var converged = false
      var iter = 0
      while (!converged) {
        iter += 1
        val prop = edges.join(labels, edges("dst") === labels("doc_id"))
          .select(edges("src").as("doc_id"), col("cluster_id"))
        val plan = labels.unionByName(prop)
          .groupBy("doc_id").agg(min("cluster_id").as("cluster_id"))
        // cut the lineage periodically: the plan nests one level per
        // iteration, and a long-chain component would otherwise grow
        // catalyst analysis quadratically (the standard iterative-Spark
        // hazard GraphX handles the same way); localCheckpoint also
        // protects the loop from cache-eviction re-derivation
        val next =
          if (iter % 5 == 0) plan.localCheckpoint()
          else plan.persist()
        val improved = next
          .join(labels.withColumnRenamed("cluster_id", "_old"), "doc_id")
          .filter(col("cluster_id") < col("_old")).limit(1).count()
        labels.unpersist()
        labels = next
        converged = improved == 0
      }
      labels
    } finally edges.unpersist()
  }

  private val langSets: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "los"),
    "de" -> Seq("der", "die", "das", "und", "ist", "von", "mit"),
    "fr" -> Seq("le", "les", "des", "et", "est", "une", "dans"))

  private def sqlList(ws: Seq[String]) = ws.map(w => s"'$w'").mkString(", ")

  // MinHash parameters: 16 permutations in 4 bands of 4 rows →
  // P(candidate) = 1-(1-J^4)^4 ≈ .99 at J=0.9, ≈ .22 at J=0.5
  private val NumPerm = 16
  private val BandSize = 4

  // Portable MinHash permutation family: m_i(sh) = (a_i·h(sh) + b_i) mod p
  // with p = 2^31−1 (Mersenne) and h(sh) = first 7 hex chars of md5(sh)
  // (28 bits < p, so a_i·h < 2^59 never overflows a SIGNED int64 in any
  // engine — the entire sketch is plain 64-bit integer arithmetic that
  // DuckDB replays verbatim, which is what lets doc_minhash_pairs sit
  // behind the driver's full hash gate instead of a rows-only check).
  // a_i/b_i are md5-derived constants INLINED as literals into both the
  // Spark plan and the oracle SQL — no cross-engine RNG to disagree on.
  private val MinHashP = 2147483647L
  private def hex7(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(d.take(7), 16)
  }
  private val PermA: IndexedSeq[Long] = (0 until NumPerm).map(i => hex7(s"a$i") + 1)
  private val PermB: IndexedSeq[Long] = (0 until NumPerm).map(i => hex7(s"b$i"))

  /** clusters computed once per (JVM, fixture) and kept materialized —
    * both cluster queries reuse them, the way a real pipeline computes
    * components once and fans consumers out from the result */
  private val clusterCache =
    new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()

  private def cachedClusters(s: SparkSession, d: String): DataFrame =
    // keyed by (application, fixture): a DataFrame must not outlive its
    // SparkSession when a same-JVM caller recreates the session
    clusterCache.computeIfAbsent(s"${s.sparkContext.applicationId}:$d",
      _ => dupClusters(jaccardPairs(s, d, 0.5)).persist())

  /** exposed so Bench surfaces the one-time clustering as a build entry
    * (hiding it inside a discarded cold run would undercount the round) */
  private[graft] def ensureClusters(s: SparkSession, d: String): Unit = {
    cachedClusters(s, d).count(); ()
  }

  /** Entity-resolution clusters: connected components over the fuzzy
    * (edit-distance ≤ 1) name-pair graph — the canonicalize-customers
    * step of a record-linkage pipeline, composed from the same two
    * scale shapes as document dedup (deletion-neighborhood equi-join
    * for pairs, min-label propagation for components). Cached per
    * (application, fixture) like the document clusters. */
  private val entityClusterCache =
    new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()

  private def cachedEntityClusters(s: SparkSession, d: String): DataFrame =
    entityClusterCache.computeIfAbsent(
      s"${s.sparkContext.applicationId}:$d",
      _ => dupClusters(fuzzyNeighbors(T.customer(s, d), "c_custkey", "c_name")
        .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"))).persist())

  private[graft] def ensureEntityClusters(s: SparkSession, d: String): Unit = {
    cachedEntityClusters(s, d).count(); ()
  }

  /** ONE definition of the exact word-trigram pair graph for every
    * oracle that needs it (the pairs query and both cluster queries
    * must agree on the SAME pairs or a borderline edge desynchronizes
    * them): CTE chain ending in p0(doc_a, doc_b, inter) + sz(doc_id, n).
    * The threshold filter lives in [[jpairsCte]] and compares the
    * ROUNDED jaccard, matching the Spark side's round(...,4) filter —
    * an exact-ratio filter would diverge on values in [0.49995, 0.5).
    */
  private val jaccardCtes =
    """tokform AS (
          SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS ts FROM documents),
        tok AS (SELECT doc_id, unnest(ts) AS t, generate_subscripts(ts, 1) AS i FROM tokform),
        tri AS (SELECT DISTINCT a.doc_id, a.t || ' ' || b.t || ' ' || c.t AS sh
                FROM tok a
                JOIN tok b ON a.doc_id = b.doc_id AND b.i = a.i + 1
                JOIN tok c ON a.doc_id = c.doc_id AND c.i = a.i + 2),
        sz AS (SELECT doc_id, count(*) AS n FROM tri GROUP BY 1),
        p0 AS (SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, count(*) AS inter
               FROM tri x JOIN tri y ON x.sh = y.sh AND x.doc_id < y.doc_id
               GROUP BY 1, 2)"""

  /** thresholded pair edges on top of [[jaccardCtes]] */
  private val jpairsCte =
    """jpairs AS (SELECT doc_a, doc_b FROM p0
                  JOIN sz sa ON sa.doc_id = doc_a JOIN sz sb ON sb.doc_id = doc_b
                  WHERE round(inter * 1.0 / (sa.n + sb.n - inter), 4) >= 0.5)"""

  /** Fuzzy string matching at scale via DELETION NEIGHBORHOODS (the
    * FastSS / SymSpell family): two strings within edit distance 1
    * always share a member of {s} ∪ {s minus one char}, so candidate
    * generation is an EQUI-join on the exploded variants (blow-up
    * factor = string length + 1, vocabulary-scale shuffle — never the
    * O(N²) cross join a naive fuzzy join plans), and the codegen'd
    * `levenshtein` verifies candidates exactly. The oracle IS the
    * brute-force quadratic form, so the banding algorithm's recall is
    * proven complete, not sampled.
    */
  private[graft] def fuzzyNeighbors(
      df: org.apache.spark.sql.DataFrame, idCol: String, strCol: String): org.apache.spark.sql.DataFrame = {
    // Shape (measured on the 100x scale replica): the string payload
    // rides THROUGH the band self-join and the exact verify runs INLINE
    // on the join output, deduping only TRUE pairs afterwards. The
    // earlier ids-only shape (distinct the candidate id-pairs, then two
    // equi-joins to re-attach names) lost 1.6x end-to-end at 100x: on a
    // dense-neighborhood corpus the variant-dup factor is tiny (195.5M
    // raw -> 191.2M distinct candidates, 1.02x), so the early distinct
    // saved almost no verify work while shuffling 191M id-pairs three
    // more times (distinct + 2 joins). Verify-first shrinks the distinct
    // input to the 52.5M true pairs and removes both joins; the band
    // exchange is wider by the one string column, but it's 7x fewer rows
    // than the pair stream it replaces.
    val names = df.select(col(idCol).as("id"), col(strCol).as("s"))
    // the variant string never enters the shuffle: the join key is its
    // 64-bit hash (narrower exchange than raw variants); a hash
    // collision only ADDS a candidate pair, which the exact verify
    // discards — recall stays complete
    //
    // repartition by the band hash BEFORE the self-join: without it the
    // whole explode → join → levenshtein chain inherits the SOURCE
    // scan's split count (a compact names table reads as a handful of
    // splits, so the verify — the dominant cost — ran on 3 of 32 cores;
    // measured r17: 5.6 s → 1.1 s warm at sf0.1). The count never
    // shrinks an already-parallel input: max(cluster parallelism, the
    // source's own splits). Hash partitioning (not round-robin) keeps
    // the exchange deterministic under task retry and co-partitions
    // both join sides.
    val spark = df.sparkSession
    val bandParts = math.max(spark.sparkContext.defaultParallelism,
      names.queryExecution.toRdd.getNumPartitions)
    val bands = names.select(col("id"), col("s"), explode(expr(
      """array_distinct(concat(array(s),
           transform(sequence(1, length(s)),
             i -> concat(substring(s, 1, i - 1),
                         substring(s, i + 1, length(s))))))""")).as("variant"))
      .select(col("id"), col("s"), xxhash64(col("variant")).as("vh"))
      .repartition(bandParts, col("vh"))
    bands.as("a")
      .join(bands.as("b"), col("a.vh") === col("b.vh") &&
        col("a.id") =!= col("b.id"))
      // banded DP: threshold-1 levenshtein is O(len), not O(len²) —
      // ~25x fewer cells per verify on these names (returns -1 above
      // the threshold, so >= 0 keeps distances {0, 1})
      .filter(levenshtein(col("a.s"), col("b.s"), 1) >= 0)
      .select(col("a.id").as("id_a"), col("a.s").as("s_a"),
        col("b.id").as("id_b"), col("b.s").as("s_b"))
      .distinct() // two strings can share several deletion variants
  }

  /** Within-document segment dedup (the C4/CommonCrawl line-dedup
    * cleaning step): split each doc on `sep`, keep only the FIRST
    * occurrence of every repeated segment, and reassemble in original
    * order. Two map-side-combined hash aggregates — (doc, segment)
    * first-position, then per-doc ordered reassembly via a struct-sorted
    * collect — so the shape scales like any grouped aggregation: shuffle
    * keyed by doc, no window over the corpus, no UDF. Real pipelines
    * pass "\n" (line dedup); the oracle entry uses " " because the
    * synthetic corpus is single-line (spec covers the multi-line case).
    */
  def dedupSegments(docs: DataFrame, sep: String): DataFrame = {
    val parts = docs.select(col("doc_id"),
        posexplode(split(col("text"),
          java.util.regex.Pattern.quote(sep))))
      .toDF("doc_id", "pos", "seg")
    parts.groupBy(col("doc_id"), col("seg")).agg(min(col("pos")).as("mn"))
      .groupBy(col("doc_id"))
      .agg(
        array_join(expr(
          "transform(array_sort(collect_list(struct(mn, seg))), x -> x.seg)"),
          sep).as("clean_text"),
        count(lit(1)).as("n_segments"))
  }

  /** Corpus-level boilerplate removal (the OTHER half of the C4 line
    * cleaning recipe): segments whose document frequency exceeds
    * `maxDf` are boilerplate (headers, footers, cookie banners at web
    * scale) and are stripped from every document; remaining segments
    * keep their original order, and a fully-boilerplate document
    * survives as an empty row (a training pipeline filters those next,
    * it must not lose track of them). Shapes: distinct + count per
    * segment (map-side combined), then a left-anti join keyed on the
    * segment — the shuffle carries (doc_id, pos, seg) tuples, never
    * whole documents, and no window touches the corpus. */
  def stripBoilerplate(docs: DataFrame, sep: String, maxDf: Long): DataFrame = {
    val parts = docs.select(col("doc_id"),
        posexplode(split(col("text"), java.util.regex.Pattern.quote(sep))))
      .toDF("doc_id", "pos", "seg")
    val boiler = parts.select(col("doc_id"), col("seg")).distinct()
      .groupBy(col("seg")).agg(count(lit(1)).as("df"))
      .filter(col("df") > maxDf).select(col("seg"))
    val kept = parts.join(boiler, Seq("seg"), "left_anti")
      .groupBy(col("doc_id"))
      .agg(
        array_join(expr(
          "transform(array_sort(collect_list(struct(pos, seg))), x -> x.seg)"),
          sep).as("clean_text"),
        count(lit(1)).as("n_segments"))
    docs.select(col("doc_id")).join(kept, Seq("doc_id"), "left_outer")
      .select(col("doc_id"),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        coalesce(col("n_segments"), lit(0L)).as("n_segments"))
  }

  val queries: Seq[GQuery] = Seq(

    // ---- corpus-level boilerplate strip --------------------------------
    // threshold: half the corpus — segments in more than 50% of docs are
    // boilerplate (the fixture's ubiquitous filler words play the role
    // of web boilerplate lines)
    GQuery("doc_boilerplate_strip",
      (s, d) => {
        val docs = T.documents(s, d).select(col("doc_id"), col("text"))
        stripBoilerplate(docs, " ", docs.count() / 2).orderBy("doc_id")
      },
      Some("""WITH segs AS (
          SELECT doc_id, unnest(string_split(text, ' ')) AS seg,
                 generate_subscripts(string_split(text, ' '), 1) AS pos
          FROM documents),
        boiler AS (SELECT seg FROM (
            SELECT seg, count(DISTINCT doc_id) AS df FROM segs GROUP BY seg)
          WHERE df > (SELECT count(*) FROM documents) // 2),
        kept AS (SELECT s.doc_id, s.pos, s.seg FROM segs s
                 WHERE s.seg NOT IN (SELECT seg FROM boiler)),
        agg AS (SELECT doc_id, string_agg(seg, ' ' ORDER BY pos) AS clean_text,
                       CAST(count(*) AS BIGINT) AS n_segments
                FROM kept GROUP BY doc_id)
        SELECT d.doc_id, coalesce(a.clean_text, '') AS clean_text,
               coalesce(a.n_segments, 0) AS n_segments
        FROM documents d LEFT JOIN agg a USING (doc_id)
        ORDER BY d.doc_id""")),

    // ---- within-document segment dedup ---------------------------------
    GQuery("doc_segment_dedup",
      (s, d) => dedupSegments(
          T.documents(s, d).select(col("doc_id"), col("text")), " ")
        .orderBy("doc_id"),
      Some("""WITH segs AS (
          SELECT doc_id, unnest(string_split(text, ' ')) AS seg,
                 generate_subscripts(string_split(text, ' '), 1) AS pos
          FROM documents),
        firsts AS (SELECT doc_id, seg, min(pos) AS mn
                   FROM segs GROUP BY doc_id, seg)
        SELECT doc_id, string_agg(seg, ' ' ORDER BY mn) AS clean_text,
               CAST(count(*) AS BIGINT) AS n_segments
        FROM firsts GROUP BY doc_id ORDER BY doc_id""")),

    // ---- edit-distance-1 fuzzy self-join over customer names ----------
    // (TPC-H names differ in single digits, so true pairs abound); the
    // oracle brute-forces all N² levenshtein distances — the banded
    // algorithm must reproduce it exactly
    GQuery("fuzzy_name_pairs",
      (s, d) => fuzzyNeighbors(T.customer(s, d), "c_custkey", "c_name")
        .groupBy(col("id_a").as("c_custkey"), col("s_a").as("c_name"))
        .agg(count(lit(1)).as("n_neighbors"))
        .orderBy("c_custkey"),
      Some("""SELECT a.c_custkey, a.c_name,
          CAST(count(*) AS BIGINT) AS n_neighbors
        FROM customer a JOIN customer b
          ON a.c_custkey <> b.c_custkey
         AND levenshtein(a.c_name, b.c_name) <= 1
        GROUP BY a.c_custkey, a.c_name
        ORDER BY a.c_custkey""")),

    // ---- entity resolution: components over the fuzzy-pair graph ------
    // oracle = recursive transitive closure over the SAME brute-force
    // N² edit-distance pairs (the doc_dup_clusters pattern), so both the
    // banding recall AND the component labeling are proven exact
    GQuery("fuzzy_entity_clusters",
      (s, d) => cachedEntityClusters(s, d)
        .select(col("doc_id").as("c_custkey"), col("cluster_id"))
        .orderBy("c_custkey"),
      Some("""WITH RECURSIVE
        fpairs AS (SELECT a.c_custkey AS id_a, b.c_custkey AS id_b
                   FROM customer a JOIN customer b
                     ON a.c_custkey <> b.c_custkey
                    AND levenshtein(a.c_name, b.c_name) <= 1),
        edges AS (SELECT id_a AS s, id_b AS t FROM fpairs
                  UNION SELECT id_b, id_a FROM fpairs),
        reach AS (SELECT s AS id, s AS r FROM edges
                  UNION
                  SELECT e.s, reach.r FROM edges e JOIN reach ON reach.id = e.t)
        SELECT id AS c_custkey, min(r) AS cluster_id FROM reach
        GROUP BY id ORDER BY c_custkey""")),

    // ---- exact dedup ---------------------------------------------------
    GQuery("doc_exact_dedup",
      (s, d) => T.documents(s, d)
        .withColumn("fp", md5(regexp_replace(lower(trim(col("text"))), "\\s+", " ")))
        .groupBy("fp")
        .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_copies"))
        .orderBy("fp"),
      Some("""SELECT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp,
        min(doc_id) AS keep_id, count(*) AS n_copies
        FROM documents GROUP BY 1 ORDER BY fp""")),

    // ---- quality / stats ----------------------------------------------
    GQuery("doc_text_stats",
      (s, d) => T.documents(s, d)
        .withColumn("tk", toks)
        .select(col("doc_id"),
          length(col("text")).as("n_chars"),
          size(col("tk")).as("n_tokens"),
          size(array_distinct(col("tk"))).as("n_distinct"),
          // floor-scaled ints, not round(x/y, k): 189/40 = 4.725 rounds to
          // 4.73 in Spark (decimal-string HALF_UP) but 4.72 in DuckDB
          // (binary double) — floor has one rule in both engines
          floor(size(array_distinct(col("tk"))) * lit(10000.0) / size(col("tk")))
            .as("vocab_ratio_x10k"),
          floor(length(regexp_replace(col("text"), "\\s", "")) * lit(100.0)
            / size(col("tk"))).as("avg_token_len_x100"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id,
        CAST(length(text) AS INT) AS n_chars,
        CAST(len(string_split_regex(lower(trim(text)), '\s+')) AS INT) AS n_tokens,
        CAST(len(list_distinct(string_split_regex(lower(trim(text)), '\s+'))) AS INT) AS n_distinct,
        CAST(floor(len(list_distinct(string_split_regex(lower(trim(text)), '\s+'))) * 10000.0
          / len(string_split_regex(lower(trim(text)), '\s+'))) AS BIGINT) AS vocab_ratio_x10k,
        CAST(floor(length(regexp_replace(text, '\s', '', 'g')) * 100.0
          / len(string_split_regex(lower(trim(text)), '\s+'))) AS BIGINT) AS avg_token_len_x100
        FROM documents ORDER BY doc_id""")),

    // ---- quality score (length / punctuation / stopword / digit ratios)
    // the composite "keep or drop" signal of a pretraining text filter;
    // ratios as floor-scaled ints (see doc_text_stats note on round())
    GQuery("doc_quality_score",
      (s, d) => {
        val en = langSets.head._2
        T.documents(s, d)
          .withColumn("tk", toks)
          .select(col("doc_id"),
            length(col("text")).as("n_chars"),
            // nullif guards the empty document: Spark x/0 yields NULL but
            // DuckDB double-division gives inf -> CAST error; nullif makes
            // both engines emit NULL
            floor(length(regexp_replace(col("text"), "[^\\p{Punct}]", ""))
              * lit(10000.0) / expr("nullif(length(text), 0)")).as("punct_x10k"),
            floor(length(regexp_replace(col("text"), "[^0-9]", ""))
              * lit(10000.0) / expr("nullif(length(text), 0)")).as("digit_x10k"),
            floor(expr(s"size(filter(tk, t -> t IN (${sqlList(en)})))")
              * lit(10000.0) / size(col("tk"))).as("stopword_x10k"))
          .withColumn("keep",
            (col("n_chars") >= 50 && col("punct_x10k") < 2000 &&
              col("digit_x10k") < 3000 && col("stopword_x10k") >= 300).cast("int"))
          .orderBy("doc_id")
      },
      Some {
        val en = sqlList(langSets.head._2)
        s"""WITH q AS (SELECT doc_id,
          CAST(length(text) AS INT) AS n_chars,
          CAST(floor(length(regexp_replace(text, '[^[:punct:]]', '', 'g'))
            * 10000.0 / nullif(length(text), 0)) AS BIGINT) AS punct_x10k,
          CAST(floor(length(regexp_replace(text, '[^0-9]', '', 'g'))
            * 10000.0 / nullif(length(text), 0)) AS BIGINT) AS digit_x10k,
          CAST(floor(len(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
            t -> t IN ($en))) * 10000.0
            / len(string_split_regex(lower(trim(text)), '\\s+'))) AS BIGINT) AS stopword_x10k
        FROM documents)
        SELECT *, CAST(n_chars >= 50 AND punct_x10k < 2000 AND digit_x10k < 3000
          AND stopword_x10k >= 300 AS INT) AS keep
        FROM q ORDER BY doc_id"""
      }),

    // ---- language id (stopword-hit heuristic) -------------------------
    GQuery("doc_lang_id",
      (s, d) => {
        val hits = langSets.map { case (lang, ws) =>
          expr(s"""size(filter(tk, t -> t IN (${sqlList(ws)})))""").as(s"${lang}_hits")
        }
        val pred = expr(
          """CASE WHEN en_hits >= es_hits AND en_hits >= de_hits AND en_hits >= fr_hits THEN 'en'
                  WHEN es_hits >= de_hits AND es_hits >= fr_hits THEN 'es'
                  WHEN de_hits >= fr_hits THEN 'de'
                  ELSE 'fr' END""").as("pred_lang")
        T.documents(s, d).withColumn("tk", toks)
          .select(col("doc_id") +: hits :+ pred: _*)
          .orderBy("doc_id")
      },
      Some {
        val hitCols = langSets.map { case (lang, ws) =>
          s"""CAST(len(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
             t -> t IN (${sqlList(ws)}))) AS INT) AS ${lang}_hits"""
        }.mkString(",\n        ")
        s"""WITH h AS (SELECT doc_id, $hitCols FROM documents)
        SELECT doc_id, en_hits, es_hits, de_hits, fr_hits,
          CASE WHEN en_hits >= es_hits AND en_hits >= de_hits AND en_hits >= fr_hits THEN 'en'
               WHEN es_hits >= de_hits AND es_hits >= fr_hits THEN 'es'
               WHEN de_hits >= fr_hits THEN 'de'
               ELSE 'fr' END AS pred_lang
        FROM h ORDER BY doc_id"""
      }),

    // ---- BPE-ish regex token counting ---------------------------------
    GQuery("doc_token_count",
      (s, d) => T.documents(s, d)
        .select(col("doc_id"),
          expr("""size(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]', 0))""")
            .as("n_subtokens"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id,
        CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS INT)
          AS n_subtokens
        FROM documents ORDER BY doc_id""")),

    // ---- near-dup: exact Jaccard on word trigrams (inverted index) ----
    GQuery("doc_ngram_jaccard_pairs",
      // routed through the corpus-statistics dispatch ([[chooseJaccardForm]],
      // memoized per sf dir); both forms are pair-identical so the
      // oracle is unchanged
      (s, d) => jaccardPairsByForm(jaccardFormFor(s, d), T.documents(s, d), 0.5)
        .orderBy("doc_a", "doc_b"),
      Some(s"""WITH $jaccardCtes
        SELECT doc_a, doc_b,
          round(inter * 1.0 / (sa.n + sb.n - inter), 4) AS jaccard
        FROM p0 JOIN sz sa ON sa.doc_id = doc_a JOIN sz sb ON sb.doc_id = doc_b
        WHERE round(inter * 1.0 / (sa.n + sb.n - inter), 4) >= 0.5
        ORDER BY doc_a, doc_b""")),

    // ---- near-dup CLUSTERS: connected components over the pair graph --
    // (doc_id, cluster_id = min doc_id of the component); oracle is a
    // recursive transitive closure over the same exact-Jaccard pairs
    GQuery("doc_dup_clusters",
      (s, d) => cachedClusters(s, d).orderBy("doc_id"),
      Some(s"""WITH RECURSIVE $jaccardCtes, $jpairsCte,
        edges AS (SELECT doc_a AS s, doc_b AS t FROM jpairs
                  UNION SELECT doc_b, doc_a FROM jpairs),
        reach AS (SELECT s AS id, s AS r FROM edges
                  UNION
                  SELECT e.s, reach.r FROM edges e JOIN reach ON reach.id = e.t)
        SELECT id AS doc_id, min(r) AS cluster_id FROM reach
        GROUP BY id ORDER BY doc_id""")),

    // keep-one-per-cluster semantic dedup: canonical member (min doc_id)
    // survives, other cluster members drop, singletons untouched
    GQuery("doc_dedup_semantic",
      (s, d) => {
        val clusters = cachedClusters(s, d)
        T.documents(s, d).select(col("doc_id"))
          .join(clusters.filter(col("doc_id") =!= col("cluster_id"))
            .select(col("doc_id")), Seq("doc_id"), "left_anti")
          .orderBy("doc_id")
      },
      Some(s"""WITH RECURSIVE $jaccardCtes, $jpairsCte,
        edges AS (SELECT doc_a AS s, doc_b AS t FROM jpairs
                  UNION SELECT doc_b, doc_a FROM jpairs),
        reach AS (SELECT s AS id, s AS r FROM edges
                  UNION
                  SELECT e.s, reach.r FROM edges e JOIN reach ON reach.id = e.t),
        clusters AS (SELECT id, min(r) AS cluster_id FROM reach GROUP BY id)
        SELECT doc_id FROM documents
        WHERE doc_id NOT IN (SELECT id FROM clusters WHERE id <> cluster_id)
        ORDER BY doc_id""")),

    // ---- end-to-end curation pipeline (the composite flagship) --------
    // The full training-data prep chain as ONE declarative plan:
    //   near-dup keep-one (exact dups pair at J = 1, so the cluster
    //   graph subsumes exact dedup) → quality filter (the
    //   doc_quality_score rule) → BPE tokenize (real token counts) →
    //   pack into 256-token training sequences.
    // Each stage is the already-oracle-proven operator; what this entry
    // pins is their COMPOSITION — filters and projections flow through
    // the whole chain as one Catalyst plan (dedup survivors prune
    // before tokenization; tokenization streams per-row; only the final
    // pack shuffles, on 8 content-hash streams), which is exactly how
    // the stages compose at 100 TB instead of materializing between
    // steps. Output: (doc_id, bucket, seq) — the training-sequence
    // assignment of every surviving document.
    GQuery("doc_curation_pipeline",
      (s, d) => {
        val clusters = cachedClusters(s, d)
        val en = langSets.head._2
        val surv = T.documents(s, d)
          .join(clusters.filter(col("doc_id") =!= col("cluster_id"))
            .select(col("doc_id")), Seq("doc_id"), "left_anti")
        val kept = surv.withColumn("tk", toks)
          .withColumn("punct_x10k",
            floor(length(regexp_replace(col("text"), "[^\\p{Punct}]", ""))
              * lit(10000.0) / expr("nullif(length(text), 0)")))
          .withColumn("digit_x10k",
            floor(length(regexp_replace(col("text"), "[^0-9]", ""))
              * lit(10000.0) / expr("nullif(length(text), 0)")))
          .withColumn("stopword_x10k",
            floor(expr(s"size(filter(tk, t -> t IN (${sqlList(en)})))")
              * lit(10000.0) / size(col("tk"))))
          .filter(length(col("text")) >= 50 && col("punct_x10k") < 2000 &&
            col("digit_x10k") < 3000 && col("stopword_x10k") >= 300)
        val withTok = kept.withColumn("tok",
          size(Tokenize.encodeExpr("text", Tokenize.FixedMerges)).cast("long"))
        Prep.packSequences(withTok, "doc_id", "tok", budget = 256, buckets = 8)
          .orderBy("doc_id")
      },
      Some {
        val en = sqlList(langSets.head._2)
        s"""WITH RECURSIVE $jaccardCtes, $jpairsCte,
        edges AS (SELECT doc_a AS s, doc_b AS t FROM jpairs
                  UNION SELECT doc_b, doc_a FROM jpairs),
        reach AS (SELECT s AS id, s AS r FROM edges
                  UNION
                  SELECT e.s, reach.r FROM edges e JOIN reach ON reach.id = e.t),
        clusters AS (SELECT id, min(r) AS cluster_id FROM reach GROUP BY id),
        surv AS (SELECT * FROM documents
          WHERE doc_id NOT IN (SELECT id FROM clusters WHERE id <> cluster_id)),
        kept AS (SELECT doc_id, text FROM surv
          WHERE length(text) >= 50
            AND floor(length(regexp_replace(text, '[^[:punct:]]', '', 'g'))
                  * 10000.0 / nullif(length(text), 0)) < 2000
            AND floor(length(regexp_replace(text, '[^0-9]', '', 'g'))
                  * 10000.0 / nullif(length(text), 0)) < 3000
            AND floor(len(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                  t -> t IN ($en))) * 10000.0
                  / len(string_split_regex(lower(trim(text)), '\\s+'))) >= 300),
        ${Tokenize.symsCte(Tokenize.FixedMerges, from = "kept")},
        cp AS (SELECT k.doc_id, CAST(coalesce(len(sy), 0) AS BIGINT) AS tok
               FROM kept k LEFT JOIN syms ON syms.doc_id = k.doc_id),
        ${Prep.packOracleCtes("cp")}
        SELECT doc_id, bucket, seq FROM packed ORDER BY doc_id"""
      }),

    // ---- near-dup: MinHash + LSH banding (candidate gen + verify) -----
    // Portable universal-hash signatures (see MinHashP/PermA/PermB above)
    // make the whole candidate-generation + verify pipeline replayable in
    // ANSI SQL → full driver hash gate. MinHashSpec additionally asserts
    // it finds the same >=0.9 pairs as the exact-Jaccard query.
    GQuery("doc_minhash_pairs",
      (s, d) => {
        // spread before the shingle/signature stage — same 1-split
        // pre-exchange hazard as shingledFrom (the sketch explode+md5 is
        // the dominant per-row work of this query)
        // localCheckpoint: the (doc_id, tri) frame feeds THREE consumers
        // (the signature chain and both verify joins), and each would
        // re-tokenize + re-shingle the corpus — the pre-explode frame is
        // the compact thing to materialize (O(corpus shingle sets), never
        // the exploded postings). Intra-query only: every invocation
        // recomputes from parquet. Measured r18: 1.89 → 1.40 s at sf0.1.
        val docs = T.spreadSmall(T.documents(s, d)).withColumn("tk", toks)
          .select(col("doc_id"), expr(triExpr).as("tri"))
          .filter(size(col("tri")) > 0)
          .localCheckpoint()
        // Signatures via explode + NumPerm min-aggregates, NOT nested
        // array HOFs: higher-order lambdas sit outside Spark's common-
        // subexpression elimination, so an array formulation recomputes
        // the md5 per PERMUTATION (measured 8x slower end-to-end). Here
        // each shingle row hashes ONCE in codegen and the 16 mins
        // combine map-side — also the honest 100 TB shape: the shuffle
        // carries (doc_id, 16 longs) partial aggregates, never shingles.
        val sh_ = docs.select(col("doc_id"), explode(col("tri")).as("sh"))
          .withColumn("h",
            conv(substring(md5(col("sh")), 1, 7), 16, 10).cast("long"))
        val sigs = sh_.groupBy("doc_id").agg(
          array((0 until NumPerm).map(i =>
            min((lit(PermA(i)) * col("h") + lit(PermB(i))) % lit(MinHashP))): _*)
            .as("sig"))
        // candidate generation exchanges (doc_id, band_id, band_key)
        // ONLY — at 100 TB the band self-join shuffles three scalar
        // columns, never the shingle payloads (those re-join ONCE below,
        // for the verify step, keyed by doc id)
        val bands = sigs.select(col("doc_id"),
          posexplode(expr(
            s"transform(sequence(0, ${NumPerm / BandSize - 1}), " +
            s"b -> concat_ws(',', transform(slice(sig, b * $BandSize + 1, $BandSize), " +
            s"x -> cast(x as string))))")))
          .withColumnRenamed("pos", "band_id").withColumnRenamed("col", "band_key")
        val a = bands.as("a"); val b = bands.as("b")
        val cand = a.join(b,
            col("a.band_id") === col("b.band_id") &&
            col("a.band_key") === col("b.band_key") &&
            col("a.doc_id") < col("b.doc_id"))
          .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
          .dropDuplicates("doc_a", "doc_b")
        cand
          .join(docs.select(col("doc_id").as("doc_a"), col("tri").as("tri_a")), "doc_a")
          .join(docs.select(col("doc_id").as("doc_b"), col("tri").as("tri_b")), "doc_b")
          .withColumn("inter", size(array_intersect(col("tri_a"), col("tri_b"))))
          .withColumn("jaccard", round(col("inter") /
            (size(col("tri_a")) + size(col("tri_b")) - col("inter")), 4))
          .filter(col("jaccard") >= 0.5)
          .select("doc_a", "doc_b", "jaccard")
          .orderBy("doc_a", "doc_b")
      },
      Some {
        val perms = (0 until NumPerm)
          .map(i => s"(${i}, ${PermA(i)}, ${PermB(i)})").mkString(", ")
        s"""WITH $jaccardCtes,
        perms(i, a, b) AS (VALUES $perms),
        trih AS (SELECT doc_id, CAST(('0x' || substr(md5(sh), 1, 7)) AS BIGINT) AS h
                 FROM tri),
        mh AS (SELECT doc_id, p.i, min((p.a * h + p.b) % $MinHashP) AS m
               FROM trih CROSS JOIN perms p GROUP BY doc_id, p.i),
        bands AS (SELECT doc_id, i // $BandSize AS band_id,
                         string_agg(CAST(m AS VARCHAR), ',' ORDER BY i) AS bk
                  FROM mh GROUP BY doc_id, i // $BandSize),
        cand AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
                 FROM bands x JOIN bands y
                   ON x.band_id = y.band_id AND x.bk = y.bk AND x.doc_id < y.doc_id)
        SELECT c.doc_a, c.doc_b,
               round(p0.inter * 1.0 / (sa.n + sb.n - p0.inter), 4) AS jaccard
        FROM cand c JOIN p0 ON p0.doc_a = c.doc_a AND p0.doc_b = c.doc_b
        JOIN sz sa ON sa.doc_id = c.doc_a JOIN sz sb ON sb.doc_id = c.doc_b
        WHERE round(p0.inter * 1.0 / (sa.n + sb.n - p0.inter), 4) >= 0.5
        ORDER BY 1, 2"""
      }),

    // ---- fingerprint: winnowing over a k-gram hash --------------------
    // The classic document fingerprint (winnowing): hash every token
    // 3-gram, then keep the MINIMUM of each sliding window of 4
    // gram-hashes — any shared run of >= w+k-1 tokens between two
    // documents is guaranteed to share a fingerprint (position-based,
    // unlike MinHash's set sketch). Runs as a native single-pass
    // Expression (graft.functions.WinnowFingerprint) — the nested-HOF
    // form was measured 200x slower at sf0.1. The gram hash is the
    // portable 60-bit md5 prefix and the output is the SET of window
    // minima (tie-break independent), so the whole query replays in
    // DuckDB → full hash gate; overlap behavior pinned by OpsSpec.
    GQuery("doc_winnow_fp",
      (s, d) => T.documents(s, d).withColumn("tk", toks)
        .select(col("doc_id"),
          explode(graft.functions.WinnowFingerprint.winnowFp(col("tk"), 3, 4))
            .as("fingerprint"))
        .orderBy("doc_id", "fingerprint"),
      Some("""WITH tokform AS (
          SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS ts FROM documents),
        tok AS (SELECT doc_id, unnest(ts) AS t, generate_subscripts(ts, 1) AS i FROM tokform),
        gh AS (SELECT a.doc_id, a.i,
                 CAST(('0x' || substr(md5(a.t || chr(1) || b.t || chr(1) || c.t), 1, 15))
                   AS BIGINT) AS g
               FROM tok a JOIN tok b ON b.doc_id = a.doc_id AND b.i = a.i + 1
                          JOIN tok c ON c.doc_id = a.doc_id AND c.i = a.i + 2),
        mc AS (SELECT doc_id, count(*) AS m FROM gh GROUP BY 1),
        short AS (SELECT doc_id, min(g) AS fingerprint FROM gh
                  GROUP BY doc_id HAVING count(*) < 4),
        wins AS (SELECT gh.doc_id, gh.i, mc.m,
                   min(g) OVER (PARTITION BY gh.doc_id ORDER BY gh.i
                     ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS wmin
                 FROM gh JOIN mc ON mc.doc_id = gh.doc_id),
        fw AS (SELECT DISTINCT doc_id, wmin AS fingerprint FROM wins WHERE i <= m - 3)
        SELECT doc_id, fingerprint FROM short
        UNION ALL SELECT doc_id, fingerprint FROM fw
        ORDER BY doc_id, fingerprint""")),

    // ---- fingerprint: SimHash over token hashes -----------------------
    // 60-bit SimHash: per-token portable hash (first 15 hex chars of md5
    // = 60 bits, chosen so the value fits a SIGNED int64 in every
    // engine), bit-vote per position. The md5-derived hash (vs the
    // earlier xxhash64) makes the whole sketch replayable in ANSI SQL, so
    // this graduates from rows-only to the driver's full hash gate; the
    // per-token md5 costs ~2x xxhash64 but the sketch is bulk-computed
    // once per corpus, never in a hot join. Locality pinned by OpsSpec
    // ("near-dup pairs are closer in Hamming space than random").
    GQuery("doc_simhash",
      (s, d) => T.documents(s, d)
        .withColumn("tk", toks)
        .withColumn("th", expr(
          "transform(array_distinct(tk), t -> cast(conv(substring(md5(t), 1, 15), 16, 10) as bigint))"))
        .withColumn("simhash", expr(
          """aggregate(sequence(0, 59), 0L, (acc, b) ->
               acc + if(
                 aggregate(th, 0L, (s, h) ->
                   s + if((shiftright(h, b) & 1L) = 1L, 1L, -1L)) > 0L,
                 shiftleft(1L, b), 0L))"""))
        .select(col("doc_id"), col("simhash"))
        .orderBy("doc_id"),
      Some("""WITH tokform AS (
          SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS ts FROM documents),
        th AS (SELECT doc_id, CAST(('0x' || substr(md5(t), 1, 15)) AS BIGINT) AS h
               FROM (SELECT doc_id, unnest(list_distinct(ts)) AS t FROM tokform)),
        bits AS (SELECT th.doc_id, b.b,
            CASE WHEN sum(CASE WHEN (h >> b.b) & 1 = 1 THEN 1 ELSE -1 END) > 0
                 THEN (CAST(1 AS BIGINT) << b.b) ELSE CAST(0 AS BIGINT) END AS bit
          FROM th CROSS JOIN (SELECT unnest(generate_series(0, 59)) AS b) b
          GROUP BY th.doc_id, b.b)
        SELECT doc_id, CAST(sum(bit) AS BIGINT) AS simhash FROM bits
        GROUP BY doc_id ORDER BY doc_id""")),

    // ---- TF-IDF top terms per document --------------------------------
    // rank by the RATIONAL salience tf/df (IEEE division is exactly
    // rounded, so the ordering is bit-identical on every engine; an
    // ln-based order could flip on a last-ulp libm difference), emit the
    // standard ln-idf score rounded for the value compare
    GQuery("doc_tfidf_topk",
      (s, d) => {
        val w = Window.partitionBy(col("doc_id"))
          .orderBy((col("tf") * lit(1000000.0) / col("df")).desc, col("term"))
        termStats(T.documents(s, d))
          .withColumn("tfidf",
            round(col("tf") * log(col("n_docs") * lit(1.0) / col("df")), 2))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 5)
          .select(col("doc_id"), col("term"), col("tf"), col("df"), col("tfidf"))
          .orderBy("doc_id", "term")
      },
      Some("""WITH w AS (SELECT doc_id,
                unnest(regexp_extract_all(lower(text), '[a-z]+')) AS term
              FROM documents),
           tf AS (SELECT doc_id, term, count(*) AS tf FROM w GROUP BY 1, 2),
           dfx AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
           n AS (SELECT count(*) AS n_docs FROM documents),
           scored AS (SELECT t.doc_id, t.term, t.tf, d.df,
               round(t.tf * ln(n.n_docs * 1.0 / d.df), 2) AS tfidf,
               row_number() OVER (PARTITION BY t.doc_id
                 ORDER BY t.tf * 1000000.0 / d.df DESC, t.term) AS rn
             FROM tf t JOIN dfx d USING (term) CROSS JOIN n)
        SELECT doc_id, term, tf, df, tfidf
        FROM scored WHERE rn <= 5 ORDER BY doc_id, term""")
    )
  )

  /** Corpus term statistics — the exact-integer core of TF-IDF:
    * (doc_id, term, tf, df, n_docs) over letter-run tokens. Two hash
    * aggregates (doc×term, then term) and a broadcast of the 1-row
    * corpus count: at 100 TB the doc×term aggregate is the only
    * data-scale shuffle, and it map-side combines. The per-term df join
    * shuffles on the term key (vocabulary-scale, zipf-skewed — AQE skew
    * handling applies); no window, no UDF, all codegen'd.
    */
  private[graft] def termStats(docs: DataFrame): DataFrame = {
    // (spreadSmall measured here and rejected, r18: tf feeds both the
    // df rollup and the final join, and the window below re-shuffles by
    // doc — the extra exchange lost ~0.2 s at fixture scale)
    val words = docs.select(col("doc_id"),
      explode(expr("regexp_extract_all(lower(text), '[a-z]+', 0)")).as("term"))
    val tf = words.groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfx = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    tf.join(dfx, "term").crossJoin(broadcast(n))
      .select(col("doc_id"), col("term"), col("tf"), col("df"), col("n_docs"))
  }

  /** Standard TF-IDF (raw tf × ln(N/df)) per (doc, term) — the library
    * surface; see doc_tfidf_topk for the rank-determinism note. */
  def tfIdf(docs: DataFrame): DataFrame =
    termStats(docs).withColumn("tfidf",
      col("tf") * log(col("n_docs") * lit(1.0) / col("df")))

  /** exposed for specs */
  private[graft] def exactJaccard(s: SparkSession, d: String, minJ: Double): DataFrame =
    jaccardPairs(s, d, minJ)
}
