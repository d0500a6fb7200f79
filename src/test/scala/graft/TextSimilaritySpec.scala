package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Pins the prefix-filtered exact-Jaccard join (ops.Text
  * .jaccardPairsPrefix) against the naive inverted-index join on a
  * randomized DIVERSE-vocabulary corpus — the corpus shape the prefix
  * variant exists for (the driver fixture's tiny shared vocabulary is
  * the naive join's home turf; see the measurement note on the method).
  * Prefix filtering is exact by construction; this spec guards the
  * implementation against the places the lemma is easy to break
  * (per-set prefix lengths, tie-breaking in the global shingle order,
  * the length filter, empty shingle sets).
  */
class TextSimilaritySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** 300 random docs over a 2000-word vocabulary + 30 planted near-dup
    * clones (1-2 token edits) + degenerate docs (identical twins, short
    * docs below the shingle width). Seeded — the corpus is stable. */
  private lazy val corpus = {
    import spark.implicits._
    val rnd = new scala.util.Random(421)
    def word() = s"w${rnd.nextInt(2000)}"
    val base = (0 until 300).map { i =>
      (i.toLong, Seq.fill(40)(word()).mkString(" "))
    }
    val clones = (0 until 30).map { i =>
      val tks = base(i)._2.split(" ").toBuffer
      tks(rnd.nextInt(tks.size)) = word() // one substitution
      (1000L + i, tks.mkString(" "))
    }
    val twins = Seq((2000L, base(0)._2)) // exact duplicate, J = 1.0
    val shorts = Seq((3000L, "just two"), (3001L, "")) // no shingles
    (base ++ clones ++ twins ++ shorts).toDF("doc_id", "text")
  }

  test("prefix-filtered jaccard equals the naive join at several thresholds") {
    for (t <- Seq(0.3, 0.5, 0.8)) {
      val naive = ops.Text.jaccardPairsFrom(corpus, t)
      val pref = ops.Text.jaccardPairsPrefix(corpus, t)
      val onlyNaive = naive.exceptAll(pref).count()
      val onlyPref = pref.exceptAll(naive).count()
      assert(onlyNaive == 0 && onlyPref == 0,
        s"t=$t: $onlyNaive pairs missed by prefix (FALSE NEGATIVES), " +
          s"$onlyPref extra pairs from prefix")
    }
  }

  test("chooser: diverse and hot-key corpora pick prefix; the fixture picks naive") {
    import org.apache.spark.sql.functions.{col, concat, lit}
    // diverse randomized corpus: most shingles unique → prefix
    assert(ops.Text.chooseJaccardForm(corpus) == "prefix")
    // hot-key corpus: shared boilerplate makes a few shingles df≈330 —
    // the naive join's quadratic hazard — while posting mass stays
    // rare-dominated; rarest-first prefixes exclude the hot keys → prefix
    val hot = corpus.withColumn("text", concat(col("text"),
      lit(" the quick brown fox jumps over the lazy dog again and again")))
    assert(ops.Text.chooseJaccardForm(hot) == "prefix")
    // the driver fixture's tiny shared vocabulary: nearly every shingle
    // shared, prefix prunes nothing (measured 11x loss) → naive — pinned
    // both unsampled (sf0.001) and through the default 1/4 doc sample at
    // sf0.1, the scale the bench actually dispatches at
    val tiny = Tables.documents(spark, "/root/testdata/sf0.001")
    assert(ops.Text.chooseJaccardForm(tiny, sampleMod = 1) == "naive")
    val sf01 = Tables.documents(spark, "/root/testdata/sf0.1")
    assert(ops.Text.chooseJaccardForm(sf01) == "naive")
  }

  test("jaccardPairsAuto returns the same pairs as the naive join") {
    val auto = ops.Text.jaccardPairsAuto(corpus, 0.5)
    val naive = ops.Text.jaccardPairsFrom(corpus, 0.5)
    assert(auto.exceptAll(naive).count() == 0 && naive.exceptAll(auto).count() == 0)
  }

  test("float-boundary threshold: J exactly minJ survives prefix filtering") {
    import spark.implicits._
    // na = 100, nb = 7, B's shingles ⊂ A's → J = 7/100 = 0.07 exactly.
    // In IEEE double 100 × 0.07 = 7.000000000000001: an unguarded
    // ceil(n·t) shortens A's prefix below the lemma's bound and the
    // length filter prunes the candidate — the pair silently vanishes.
    val aTokens = (0 until 102).map(i => s"t$i")
    val b = aTokens.take(9).mkString(" ") // 7 trigram shingles, all in A
    val docs = Seq((1L, aTokens.mkString(" ")), (2L, b)).toDF("doc_id", "text")
    for (t <- Seq(0.07)) {
      val naive = ops.Text.jaccardPairsFrom(docs, t).collect()
      val pref = ops.Text.jaccardPairsPrefix(docs, t).collect()
      assert(naive.length == 1, s"oracle setup broken: ${naive.toSeq}")
      assert(pref.length == 1,
        s"t=$t: boundary pair lost to floating-point prefix/length math")
    }
  }

  test("planted near-dups and exact twins are found; short docs don't pair") {
    val pairs = ops.Text.jaccardPairsPrefix(corpus, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // one-substitution clones: at most 3 of ~38 shingles differ -> J >= .85
    assert((0 until 30).forall(i => pairs.contains((i.toLong, 1000L + i))),
      "a planted near-dup clone was not recovered")
    assert(pairs.contains((0L, 2000L)), "exact twin missing")
    assert(!pairs.exists(p => p._1 >= 3000L || p._2 >= 3000L),
      "shingle-less docs must not appear in any pair")
  }
}
