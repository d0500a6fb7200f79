package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Deterministic checks for the operators whose semantics aren't
  * SQL-expressible for the DuckDB oracle (SURVEY.md §5.1): MinHash+LSH
  * candidate recall vs exact Jaccard, SimHash locality, LSH-ANN agreement
  * with brute force, multimodal feature plumbing, and harness contract
  * invariants.
  */
class OpsSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def run(name: String) =
    SparkEntry.queries(name)(spark, sf)

  test("entry smoke: flagship query returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("contract: every oracle key has a query; names are unique") {
    val qs = SparkEntry.all.map(_.name)
    assert(qs.distinct.size == qs.size)
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("tfIdf: known corpus — shared terms score 0, rare terms rank highest") {
    import spark.implicits._
    val docs = Seq(
      (1L, "apple banana apple"),
      (2L, "apple cherry"),
      (3L, "apple date date date")).toDF("doc_id", "text")
    val out = ops.Text.tfIdf(docs)
      .select($"doc_id", $"term", $"tf", $"df", $"tfidf")
      .as[(Long, String, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    // 'apple' is in every doc: idf = ln(1) = 0 regardless of tf
    assert(out((1L, "apple"))._5 == 0.0 && out((3L, "apple"))._5 == 0.0)
    // df=1 terms: tfidf = tf * ln(3)
    assert(math.abs(out((3L, "date"))._5 - 3 * math.log(3.0)) < 1e-12)
    assert(math.abs(out((2L, "cherry"))._5 - math.log(3.0)) < 1e-12)
    assert(out((1L, "banana"))._3 == 1 && out((1L, "banana"))._4 == 1)
    // every (doc, distinct term) pair present exactly once
    assert(out.size == 6)
  }

  test("contamination: verbatim copy detected, disjoint doc not flagged") {
    import spark.implicits._
    val train = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "one two three four five six seven eight nine ten")).toDF("doc_id", "text")
    val bench = Seq(
      (100L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"))
      .toDF("doc_id", "text")
    val full = ops.Hygiene.contamination(train, bench, n = 8)
      .select($"doc_id", $"n_shared_grams", $"n_benchmark_docs")
      .as[(Long, Long, Long)].collect()
    // 10 tokens → 3 distinct 8-grams, all shared; doc 2 clean
    assert(full.toSeq == Seq((1L, 3L, 1L)))
  }

  test("contamination plan: gram equi-join, no nested-loop/cartesian") {
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = run("doc_contamination")
      val bad = df.queryExecution.executedPlan.collect {
        case b: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => b.nodeName
        case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c.nodeName
      }
      assert(bad.isEmpty, s"contamination must join on the gram key, saw $bad")
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqe)
  }

  test("repetition: degenerate text maximizes top_count") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spam spam spam spam spam spam"), // 4 trigrams, all identical
      (2L, "a b c d e f")).toDF("doc_id", "text") // 4 distinct trigrams
    val rows = ops.Hygiene.repetition(docs, n = 3)
      .select($"doc_id", $"n_ngrams", $"top_count")
      .as[(Long, Long, Long)].collect().toSet
    assert(rows == Set((1L, 4L, 4L), (2L, 4L, 1L)))
  }

  test("rarity: unique vocabulary outranks stock phrasing; exact integer score") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the the the the"),      // ctf(the)=5 corpus-wide ⇒ 200000000 each
      (2L, "zebra quark axolotl"),  // unique tokens ⇒ each 1000000000
      (3L, "the zebra2")            // mixed: (200000000 + 1000000000)/2
    ).toDF("doc_id", "text")
    val got = ops.Hygiene.rarityScore(docs)
      .select($"doc_id", $"rarity_x1e9").as[(Long, Long)].collect().toMap
    assert(got(1L) == 200000000L)
    assert(got(2L) == 1000000000L)
    assert(got(3L) == 600000000L)
  }

  test("novelty: shared trigrams zero out, unique content scores full") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta"),   // all trigrams unique to doc 1
      (2L, "one two three four"),       // duplicated below ⇒ df=2 ⇒ 0
      (3L, "one two three four")
    ).toDF("doc_id", "text")
    val got = ops.Hygiene.novelty(docs, n = 3)
      .select($"doc_id", $"novelty_x10k").as[(Long, Long)].collect().toMap
    assert(got(1L) == 10000L)
    assert(got(2L) == 0L && got(3L) == 0L)
  }

  test("lm score: corpus-common transitions score lower nll than novel ones") {
    import spark.implicits._
    val docs = Seq(
      (1L, "good morning world"),   // transitions repeated corpus-wide
      (2L, "good morning world"),
      (3L, "good morning world"),
      (4L, "zebra axolotl quark")   // transitions seen once
    ).toDF("doc_id", "text")
    val got = ops.Hygiene.lmScore(docs)
      .select($"doc_id", $"avg_nll").as[(Long, Double)].collect().toMap
    assert(got(1L) == got(2L) && got(2L) == got(3L),
      "identical docs must score identically")
    assert(got(1L) < got(4L),
      s"common phrasing (${got(1L)}) must score below novel (${got(4L)})")
    // hand-check doc 4: both bigrams have c=1, so P = 2/(1+V) with V=6
    // distinct tokens ⇒ avg_nll = ln(3.5) rounded to 3 decimals
    assert(got(4L) == BigDecimal(math.log(3.5))
      .setScale(3, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("dsir: target-like raw docs outweigh off-target ones") {
    import spark.implicits._
    val docs = Seq(
      (0L, "solve the integral by parts"),   // target (id % 2 == 0)
      (2L, "solve the matrix by blocks"),
      (1L, "solve the integral by parts"),   // raw, pure target phrasing
      (3L, "click here to win prizes now"),  // raw, off-target phrasing
      (5L, "click here to win prizes now")
    ).toDF("doc_id", "text")
    val got = ops.Hygiene.dsirWeights(docs,
        org.apache.spark.sql.functions.pmod($"doc_id", lit(2L)) === 0L)
      .select($"doc_id", $"logw").as[(Long, Double)].collect().toMap
    assert(got.keySet == Set(1L, 3L, 5L), "only raw docs are scored")
    assert(got(3L) == got(5L), "identical docs must score identically")
    assert(got(1L) > got(3L),
      s"target-like (${got(1L)}) must outweigh off-target (${got(3L)})")
  }

  test("dup spans: islands recover the longest duplicated run, incl. within-doc") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e f g h i j k l"),         // shares a 10-token run with doc 2
      (2L, "p q a b c d e f g h i j r s"),
      (3L, "m m m m m")                         // within-doc repetition only
    ).toDF("doc_id", "text")
    val got = ops.Hygiene.dupSpans(docs, n = 3)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(1L) == ((10L, 8L, 10L)),
      s"doc 1: 8 duplicated grams covering 10 tokens, got ${got(1L)}")
    assert(got(2L) == ((12L, 8L, 10L)))
    assert(got(3L) == ((3L, 3L, 5L)),
      "within-doc repeats must count as duplicated")
  }

  test("minhash LSH pairs are a subset of exact-Jaccard pairs, high recall") {
    val exact = ops.Text.exactJaccard(spark, sf, 0.5)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = run("doc_minhash_pairs")
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(exact), "LSH+verify must not invent pairs")
    val high = ops.Text.exactJaccard(spark, sf, 0.9)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(high.nonEmpty, "fixture should contain planted near-dups")
    val recall = (high & lsh).size.toDouble / high.size
    assert(recall >= 0.8, s"recall@J>=0.9 was $recall")
  }

  test("simhash: near-dup pairs are closer in Hamming space than random") {
    val sims = run("doc_simhash").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val nearPairs = ops.Text.exactJaccard(spark, sf, 0.9)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(nearPairs.nonEmpty)
    val nearAvg = nearPairs.map { case (a, b) => ham(sims(a), sims(b)) }.sum.toDouble / nearPairs.size
    val ids = sims.keys.toSeq.sorted.take(60)
    val randPairs = for (i <- ids.indices; j <- i + 1 until ids.size) yield (ids(i), ids(j))
    val randAvg = randPairs.map { case (a, b) => ham(sims(a), sims(b)) }.sum.toDouble / randPairs.size
    assert(nearAvg < randAvg / 2,
      s"near-dup avg Hamming $nearAvg should be far below random $randAvg")
  }

  test("LSH near-dup pairs: subset of exact pairs, full recall on planted dups") {
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("va", "vb", "sim").collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // the catalog entry runs over the PLANTED corpus (fixture + 10
    // deterministic twins — otherwise the entry is vacuous at SFs whose
    // only natural pair sits below LSH's designed recall range); compare
    // against the exact baseline over the same planted corpus
    val fixBase = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").as("v"))
    val exactFix = pairs(ops.Similarity.exactNearDupPairs(
      ops.Similarity.plantedCorpus(fixBase), 0.5))
    val lshFix = pairs(run("emb_neardup_lsh"))
    assert(lshFix.keySet.subsetOf(exactFix.keySet))
    lshFix.foreach { case (k, sim) => assert(sim == exactFix(k)) }
    // non-vacuous: all 10 planted twins recovered through the catalog entry
    val plantedFix = lshFix.keySet.filter { case (a, b) =>
      b == a + ops.Similarity.TwinBase }  // pair order: twin (negative) first
    assert(plantedFix.size == 10, s"planted twins through catalog entry: $plantedFix")
    // planted corpus: 10 vectors get slightly-perturbed twins (cosine
    // ~0.99+) — the regime multi-table hyperplane LSH is built for;
    // every planted pair must be recovered with its exact score
    val base = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").as("v")).limit(50)
    val twins = base.filter(col("vec_id") < 10)
      .withColumn("vec_id", col("vec_id") + 100000L)
      .withColumn("v",
        expr("transform(v, (x, i) -> cast(x + 0.001d * (i % 3) as float))"))
    val corpus = base.unionByName(twins)
    val exact = pairs(ops.Similarity.exactNearDupPairs(corpus, 0.95))
    val lsh = pairs(ops.Similarity.lshNearDupPairs(corpus, 0.95))
    val planted = exact.keySet.filter { case (a, b) => b == a + 100000L }
    assert(planted.size == 10, s"expected 10 planted twin pairs, got $planted")
    assert(lsh.keySet.subsetOf(exact.keySet))
    assert(planted.subsetOf(lsh.keySet),
      s"missed planted pairs: ${planted -- lsh.keySet}")
    lsh.foreach { case (k, sim) => assert(sim == exact(k)) }
  }

  test("dup clusters: multi-hop components converge to the min label") {
    import spark.implicits._
    // two chains and one pair — the 4-node chain needs several
    // propagation rounds, pinning the iteration-until-fixpoint loop
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L),
      (20L, 21L), (21L, 22L), (22L, 23L))
      .toDF("doc_a", "doc_b")
    val out = ops.Text.dupClusters(pairs)
      .as[(Long, Long)].collect().toMap
    assert(out == Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L, 23L -> 20L))
  }

  test("winnowing fingerprints: near-dups overlap heavily, random pairs don't") {
    val fps = run("doc_winnow_fp").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    def overlap(a: Long, b: Long): Double = {
      val (x, y) = (fps.getOrElse(a, Set.empty[Long]), fps.getOrElse(b, Set.empty[Long]))
      if (x.isEmpty || y.isEmpty) 0.0
      else (x & y).size.toDouble / math.min(x.size, y.size)
    }
    val near = ops.Text.exactJaccard(spark, sf, 0.9)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(near.nonEmpty)
    val nearAvg = near.map { case (a, b) => overlap(a, b) }.sum / near.size
    val ids = fps.keys.toSeq.sorted.take(40)
    val rand = for (i <- ids.indices; j <- i + 1 until ids.size) yield (ids(i), ids(j))
    val randAvg = rand.map { case (a, b) => overlap(a, b) }.sum / rand.size
    // shared runs of >= w+k-1 tokens guarantee shared fingerprints
    assert(nearAvg > 0.5, s"near-dup overlap $nearAvg")
    assert(nearAvg > 2 * randAvg, s"near $nearAvg vs random $randAvg")
  }

  test("SQL surface: native expressions callable from SQL text after injection") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT round(cosine_sim(array(3.0D, 4.0D), array(3.0D, 4.0D)), 4) AS c,
                size(winnow_fp(array('a','b','c','d','e','f','g'), 3, 4)) AS n""")
      .collect()(0)
    assert(r.getDouble(0) == 1.0)
    assert(r.getInt(1) >= 1)
    // the builder validates arity with a clear message
    val ex = intercept[Exception](spark.sql("SELECT cosine_sim(array(1.0D))").collect())
    assert(ex.getMessage.contains("cosine_sim") || ex.getMessage.contains("two array"))
    // Column-composition functions ride the same registration path
    val r2 = spark.sql(
      """SELECT redact_pii('mail a@b.io now') AS t,
                quantize_int8(array(CAST(1.0 AS FLOAT), CAST(-2.0 AS FLOAT))) AS q,
                hash_bucket(42, 'split') AS h""").collect()(0)
    assert(r2.getString(0) == "mail <EMAIL> now")
    assert(r2.getSeq[Long](1) == Seq(63L, -127L))
    assert(r2.getLong(2) >= 0 && r2.getLong(2) < 10000)
    // BPE encode rides the same registration (frozen merge table)
    val r3 = spark.sql("SELECT bpe_encode('hash join xyz') AS t").collect()(0)
    assert(r3.getSeq[String](0) == Seq("hash", "join", "x", "y", "z"))
    // null-in -> null-out (the SQL scalar-function convention), distinct
    // from empty text -> empty array
    val r4 = spark.sql(
      "SELECT bpe_encode(CAST(NULL AS STRING)) IS NULL AS n, bpe_encode('') AS e")
      .collect()(0)
    assert(r4.getBoolean(0) && r4.getSeq[String](1).isEmpty)
  }

  test("winnowing guarantee: a shared run of w+k-1 tokens shares a fingerprint") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, explode}
    // k=3, w=4 -> any shared run of 6 tokens must yield a shared print
    val shared = "alpha beta gamma delta epsilon zeta".split(' ').toSeq
    val docA = Seq("x1", "x2") ++ shared ++ Seq("x3")
    val docB = Seq("y1") ++ shared ++ Seq("y2", "y3", "y4")
    val df = Seq((1L, docA), (2L, docB)).toDF("doc_id", "tk")
      .select(col("doc_id"),
        explode(graft.functions.WinnowFingerprint.winnowFp(col("tk"), 3, 4)).as("fp"))
    val fps = df.collect().groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getLong(1)).toSet).toMap
    assert((fps(1L) & fps(2L)).nonEmpty,
      s"guaranteed shared fingerprint missing: ${fps(1L)} vs ${fps(2L)}")
  }

  test("partition-pruned lake ANN equals the in-memory LSH ANN") {
    val mem = run("emb_ann_lsh").collect().map(_.toSeq).toSet
    val idx = run("emb_ann_partitioned").collect().map(_.toSeq).toSet
    assert(idx == mem)
    assert(idx.nonEmpty)
  }

  test("ann lsh: scores agree with brute force; positive recall") {
    val bf = run("emb_cosine_topk").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val ann = run("emb_ann_lsh").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(ann.nonEmpty)
    // same (query, candidate) pair must score identically in both paths
    val shared = ann.keySet & bf.keySet
    shared.foreach(k => assert(ann(k) == bf(k)))
    assert(shared.nonEmpty, "bucketed search should recover some true top-k")
  }

  test("sketch aggregates land within their error bounds of exact answers") {
    // the bound checks are baked into the query as integer flags (the
    // oracle hash gate expects all-1s); re-derive the exact column here
    // so the flags can't go green by checking against a wrong baseline
    val rows = run("q25_sketches").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getInt(2), r.getInt(3))).toMap
    val exact = Tables.lineitem(spark, sf)
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_orderkey")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.keySet == exact.keySet)
    exact.foreach { case (flag, n) =>
      val (en, hllOk, medOk) = rows(flag)
      assert(en == n, s"$flag: exact_orders $en vs recomputed $n")
      assert(hllOk == 1, s"$flag: HLL++ estimate outside 10% of $n")
      assert(medOk == 1, s"$flag: approx median outside exact [p45, p55]")
    }
  }

  test("segment dedup keeps first occurrences in original order (line form)") {
    import spark.implicits._
    val docs = Seq(
      (1L, "keep\ndup\nkeep2\ndup\nkeep3"),
      (2L, "a\na\na"),
      (3L, "solo")).toDF("doc_id", "text")
    val out = ops.Text.dedupSegments(docs, "\n").orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(out(0) == ((1L, "keep\ndup\nkeep2\nkeep3", 4L)))
    assert(out(1) == ((2L, "a", 1L)))
    assert(out(2) == ((3L, "solo", 1L)))
  }

  test("boilerplate strip: high-df segments drop, all-boiler docs survive empty") {
    import spark.implicits._
    val docs = Seq(
      (1L, "banner\nunique one\nfooter"),
      (2L, "banner\nunique two\nfooter"),
      (3L, "banner\nfooter")).toDF("doc_id", "text")
    // df(banner)=df(footer)=3 > 1; unique lines have df=1
    val out = ops.Text.stripBoilerplate(docs, "\n", maxDf = 1L)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(out(0) == ((1L, "unique one", 1L)))
    assert(out(1) == ((2L, "unique two", 1L)))
    assert(out(2) == ((3L, "", 0L)),
      "a fully-boilerplate doc must survive as an empty row, not vanish")
  }

  test("ann recall@k vs exact top-k stays above its measured floor") {
    // Parameter regressions (nPlanes, IvfProbe/IvfCells) must fail loudly:
    // agreement specs pin that surfaced candidates score correctly, but
    // only a recall floor catches a bucketing change that silently stops
    // surfacing true neighbors. Truth = emb_cosine_topk (exact, oracle-
    // checked). The two paths serve DIFFERENT workloads, so their floors
    // differ: IVF (data-adaptive cells, nprobe=K/2) is the mid-similarity
    // top-k scale path — measured 0.94 on the fixture at nprobe=10, floored at 0.75.
    // Hyperplane LSH at k=6 planes is tuned for HIGH-cosine near-dup
    // retrieval (planted-twin recall 1.0, pinned by the neardup spec);
    // on mid-similarity top-k its per-table collision probability is
    // (1−θ/π)^6 ≈ 0.09 at θ≈60° BY DESIGN — measured 0.12 here, floored
    // at 0.05 purely to catch collapse-to-zero bucketing bugs.
    def topk(name: String): Map[Long, Set[Long]] =
      run(name).collect().map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val exact = topk("emb_cosine_topk")
    def recallOf(name: String): Double = {
      val approx = topk(name)
      val per = exact.map { case (qid, truth) =>
        approx.getOrElse(qid, Set.empty).count(truth).toDouble / truth.size }
      per.sum / per.size
    }
    val lsh = recallOf("emb_ann_lsh")
    val ivf = recallOf("emb_ann_ivf")
    info(f"recall@10: lsh=$lsh%.3f ivf=$ivf%.3f")
    assert(lsh >= 0.05, f"LSH ANN recall@10 collapsed to $lsh%.3f (floor 0.05)")
    assert(ivf >= 0.75, f"IVF ANN recall@10 collapsed to $ivf%.3f (floor 0.75)")
  }

  test("boilerplate/segment dedup invariant under corpus doubling (SF robustness)") {
    // doc_boilerplate_strip's threshold is corpus-RELATIVE (df > n/2),
    // so driver fixture growth moves both sides of the comparison.
    // Invariance law: doubling the corpus with disjoint verbatim copies
    // doubles every segment df AND n, so the classification (and thus
    // every original doc's output row) must not move. A fixture
    // regeneration that grows the corpus therefore cannot flip results
    // — if this breaks, the threshold semantics regressed, not the data.
    import org.apache.spark.sql.DataFrame
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
    val n = docs.count()
    val doubled = docs.unionByName(
      docs.withColumn("doc_id", col("doc_id") + 10000000L))
    def originals(df: DataFrame): Seq[(Long, String, Long)] =
      df.filter(col("doc_id") < 10000000L).orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    val base = originals(ops.Text.stripBoilerplate(docs, " ", n / 2))
    val grown = originals(ops.Text.stripBoilerplate(doubled, " ", (2 * n) / 2))
    assert(base.nonEmpty && base == grown,
      "boilerplate classification moved when the corpus doubled")
    // segment dedup is per-doc: corpus membership must play no role
    val sd = originals(ops.Text.dedupSegments(docs, " "))
    val sdGrown = originals(ops.Text.dedupSegments(doubled, " "))
    assert(sd == sdGrown, "per-doc segment dedup changed with corpus size")
  }

  test("ann ivf: scores agree with brute force; positive recall") {
    val bf = run("emb_cosine_topk").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val ivf = run("emb_ann_ivf").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(ivf.nonEmpty)
    val shared = ivf.keySet & bf.keySet
    shared.foreach(k => assert(ivf(k) == bf(k)))
    assert(shared.nonEmpty, "probed cells should recover some true top-k")
  }

  test("ann ivf: centroids persist as a lake table; a fresh session loads, not retrains") {
    val before = run("emb_ann_ivf").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val trained = ops.Similarity.ivfTrains.get()
    // simulate a fresh session: drop the in-JVM cache — the only
    // surviving copy of the quantizer is the persisted centroids table
    ops.Similarity.ivfCacheReset()
    val after = run("emb_ann_ivf").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(ops.Similarity.ivfTrains.get() == trained,
      "a fresh session must REUSE persisted centroids, not re-train")
    assert(after == before,
      "results from persisted centroids must match the training session's")
    // the persisted index is a versioned lake table carrying its params
    val t = ops.Similarity.ivfTable(spark, sf)
    assert(t.exists && t.read().count() == 16)
    val meta = t.log.commits.last.metadata
    assert(meta.get("graft.ivf.k").contains("16") &&
      meta.contains("graft.ivf.corpus_rows"),
      s"build commit must record quantizer params + corpus version: $meta")
  }

  test("semDedup: twins drop, originals keep, and pairwise work is cell-bounded") {
    val out = run("emb_semantic_dedup").collect()
    val dropped = out.filter(_.getInt(2) == 0).map(_.getLong(0)).toSet
    // only twin/original pairs sit above the 0.93 threshold, and
    // keep-min-id keeps the TWIN (planted at NEGATIVE ids): every
    // dropped row must be an original 0..9, and every original whose
    // twin co-assigned to its cell (the expected case) must drop
    assert(dropped.nonEmpty && dropped.forall(id => id >= 0L && id < 10L))
    val cellOf = out.map(r => r.getLong(0) -> r.getInt(1)).toMap
    val coAssigned = (0 until 10)
      .filter(i => cellOf(i.toLong - 100000L) == cellOf(i.toLong))
    assert(coAssigned.nonEmpty && coAssigned.forall(i => dropped(i.toLong)))
    // cell-bounded candidate generation: exactly Σ_c C(n_c, 2) pairs
    // enter the dot-product verify — never the corpus-pairwise C(N, 2)
    val cells = ops.Similarity.semanticDedupCells(spark, sf)
    val sizes = out.groupBy(_.getInt(1)).view.mapValues(_.length.toLong)
    val expected = sizes.values.map(n => n * (n - 1) / 2).sum
    val n = out.length.toLong
    val candidates = ops.Similarity.semanticDupCandidates(cells).count()
    assert(candidates == expected)
    assert(candidates < n * (n - 1) / 2 / 4,
      s"candidate set $candidates not meaningfully below all-pairs ${n * (n - 1) / 2}")
  }

  test("dsir sample: keeps exactly 20%, biased toward higher importance") {
    val kept = run("doc_dsir_sample").collect()
    val all = run("doc_dsir_weight").collect()
    assert(kept.length == math.ceil(all.length * 0.2).toInt)
    val keptIds = kept.map(_.getLong(0)).toSet
    val (in, out) = all.partition(r => keptIds(r.getLong(0)))
    def meanW(rs: Array[org.apache.spark.sql.Row]) =
      rs.map(_.getDouble(2)).sum / rs.length
    // Gumbel noise perturbs but the selection must still favor weight
    assert(meanW(in) > meanW(out),
      s"kept mean logw ${meanW(in)} should exceed dropped ${meanW(out)}")
  }

  test("curation pipeline: stage-consistent output and pack-budget invariant") {
    val out = run("doc_curation_pipeline").collect()
    assert(out.nonEmpty, "pipeline should keep some documents at sf0.001")
    // survivors are a subset of semantic-dedup survivors (quality can
    // only filter further)
    val dedupSurv = run("doc_dedup_semantic").collect().map(_.getLong(0)).toSet
    val ids = out.map(_.getLong(0)).toSet
    assert(ids.subsetOf(dedupSurv))
    // pack-budget invariant: each (bucket, seq) holds ≤ 256 BPE tokens,
    // unless it is a single oversized document
    val toks = ops.Tokenize
      .bpeEncode(Tables.documents(spark, sf), "doc_id", "text")
      .groupBy("doc_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    out.groupBy(r => (r.getLong(1), r.getLong(2))).foreach { case (k, rows) =>
      val total = rows.map(r => toks.getOrElse(r.getLong(0), 0L)).sum
      assert(total <= 256 || rows.length == 1,
        s"sequence $k overflows the 256-token budget with ${rows.length} docs ($total)")
    }
  }

  test("near-dup candidate generation never shuffles payload columns") {
    // force shuffle joins (and a non-adaptive plan, so exchanges are
    // visible pre-execution) so the assertion bites even at fixture scale
    val thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      def shuffledCols(df: org.apache.spark.sql.DataFrame): Seq[Seq[String]] =
        df.queryExecution.executedPlan.collect {
          case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec =>
            e.child.output.map(_.name)
        }
      // MinHash banding: exchanges that carry band hashes must not carry
      // shingle arrays (those re-join ONCE, keyed by doc id)
      val mh = shuffledCols(run("doc_minhash_pairs"))
      assert(mh.exists(_.contains("band_key")), "expected a band-join shuffle")
      mh.filter(_.contains("band_key")).foreach(cols =>
        assert(!cols.exists(_.startsWith("tri")),
          s"band shuffle carries shingle payload: $cols"))
      // embedding LSH: exchanges that carry bucket ids must not carry
      // embedding vectors
      val nd = shuffledCols(run("emb_neardup_lsh"))
      assert(nd.exists(_.contains("bucket")), "expected a bucket-join shuffle")
      nd.filter(_.contains("bucket")).foreach(cols =>
        assert(!cols.exists(Set("v", "x", "y")),
          s"bucket shuffle carries embedding payload: $cols"))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
    }
  }

  test("domain mix: corpus rows reach the cut filter via broadcast, never a hash shuffle") {
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = run("doc_domain_mix")
      val exchanges = df.queryExecution.executedPlan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec =>
          (e.outputPartitioning.toString, e.child.output.map(_.name))
      }
      // the only exchanges allowed to carry corpus rows are the output
      // ordering's range partitioning — the per-domain cut computation
      // collects |domains|-scale counts and bakes the cuts in as
      // LITERALS, so the kept-set filter needs no join at all
      exchanges.filter(_._2.contains("doc_id")).foreach { case (part, cols) =>
        assert(part.toLowerCase.contains("range"),
          s"corpus hash-shuffled before the cut filter: $part carrying $cols")
      }
      assert(!df.queryExecution.executedPlan.toString.contains("Join"),
        "the cut filter must be a literal per-row predicate, not a join")
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqe)
  }

  test("bucketed join plans without a hash-shuffle exchange") {
    val df = run("bucketed_join")
    df.collect() // finalize the adaptive plan
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), plan.take(600))
    assert(!plan.contains("Exchange hashpartitioning"),
      "bucketed sides must not shuffle: " + plan.take(600))
  }

  test("multimodal: features/frames/meta plumbing is consistent") {
    // features now run the REAL PPM decoder: one row per doc, channel
    // sums bounded by 255 * pixel count of the id-derived dimensions
    val feat = run("multimodal_features").collect()
    assert(feat.length == run("multimodal_meta").count())
    feat.foreach { r =>
      val (id, w, h) = (r.getLong(0), r.getInt(1), r.getInt(2))
      assert(w == 4 + id % 5 && h == 3 + id % 4)
      Seq(r.getLong(3), r.getLong(4), r.getLong(5)).foreach(s =>
        assert(s >= 0 && s <= 255L * w * h, s"channel sum $s out of range"))
    }
    val meta = run("multimodal_meta")
    val frames = run("multimodal_frames")
    // one frame per started chunk, totalled across docs
    val expected = meta.agg(sum("n_chunks")).collect()(0).getLong(0)
    assert(frames.count() == expected)
  }
}
