package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the BPE tokenizer (ops.Tokenize): trainer determinism and its
  * agreement with the FROZEN merge table the oracle inlines, encode
  * equivalence against an independent rank-order reference
  * implementation, and the decode round-trip.
  */
class TokenizeSpec extends AnyFunSuite {

  import ops.Tokenize

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** independent reference encode: apply merges IN RANK ORDER, each
    * left-to-right non-overlapping — deliberately a different
    * implementation shape (symbol buffer) than the engine's
    * string-replace chain */
  private def refEncode(word: String, merges: Seq[(String, String)]): Seq[String] = {
    var syms = word.map(_.toString).toVector
    merges.foreach { case (l, r) =>
      val out = Vector.newBuilder[String]
      var i = 0
      while (i < syms.length) {
        if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
          out += l + r; i += 2
        } else { out += syms(i); i += 1 }
      }
      syms = out.result()
    }
    syms
  }

  test("trainer on a planted corpus learns the hand-derivable merges") {
    import spark.implicits._
    // "abab" x3, "abc" x2: pair counts (a,b)=8, (b,a)=3, (b,c)=2 →
    // merge1 = (a,b); then (ab,ab)=3, (ab,c)=2 → merge2 = (ab,ab)
    val docs = Seq("abab abab abab abc abc").toDF("text")
    val m = Tokenize.trainBpeMerges(docs, "text", 2)
    assert(m == Seq("a" -> "b", "ab" -> "ab"))
  }

  test("trainer tie-break is lexicographic, not input-order") {
    import spark.implicits._
    // (z,y) and (b,a) both count 2 → lexicographically smaller (b,a) wins
    val docs = Seq("zy ba zy ba").toDF("text")
    val m = Tokenize.trainBpeMerges(docs, "text", 1)
    assert(m == Seq("b" -> "a"))
  }

  test("FROZEN FixedMerges == what the trainer learns on the sf0.01 corpus") {
    // drift guard: the oracle SQL inlines FixedMerges as literals; if
    // the TRAINER changes, this fails loudly instead of the frozen list
    // silently diverging from "trained". Gated on the corpus
    // fingerprint the list was frozen against: a driver-side fixture
    // REGENERATION is not trainer drift (the frozen merges stay a
    // valid vocabulary for encode either way), so the equality check
    // cancels rather than fails — refresh FixedMerges + this hash when
    // that happens.
    val frozenAgainst = "b733c5a4f655b98c6136fbe529e33dc4"
    val cur = {
      val bytes = java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get("/root/testdata/sf0.01/documents.parquet"))
      java.security.MessageDigest.getInstance("MD5").digest(bytes)
        .map("%02x".format(_)).mkString
    }
    assume(cur == frozenAgainst,
      s"fixture corpus regenerated ($cur) — refresh Tokenize.FixedMerges")
    val docs = Tables.documents(spark, "/root/testdata/sf0.01")
    val m = Tokenize.trainBpeMerges(docs, "text", Tokenize.FixedMerges.size)
    assert(m == Tokenize.FixedMerges)
  }

  test("engine encode == rank-order reference on every corpus word + randoms") {
    import spark.implicits._
    val rnd = new scala.util.Random(77)
    val words = Seq("hash", "join", "batch", "scan", "partition", "aaa",
      "abababa", "x", "q0w9e8", "merger", "rowrow") ++
      (1 to 60).map(_ => (1 to rnd.nextInt(12) + 1)
        .map(_ => "abcehijmnoprstw" (rnd.nextInt(15))).mkString)
    val df = words.zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toDF("doc_id", "text")
    val got = Tokenize.bpeEncode(df, "doc_id", "text")
      .orderBy("doc_id", "pos").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.toSeq.sortBy(_.getInt(1))
        .map(_.getString(2))).toMap
    words.zipWithIndex.foreach { case (w, i) =>
      val exp = refEncode(w, Tokenize.FixedMerges)
      assert(got.getOrElse(i.toLong, Seq.empty) == exp, s"word $w")
    }
  }

  test("multi-word text: tokens never merge across word boundaries; round-trip") {
    import spark.implicits._
    val df = Seq((1L, "hash join"), (2L, "  batch!!scan, hash  "),
      (3L, ""), (4L, "???"), (5L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val rows = Tokenize.bpeEncode(df, "doc_id", "text")
      .orderBy("doc_id", "pos").collect()
    val byDoc = rows.groupBy(_.getLong(0)).view
      .mapValues(_.toSeq.sortBy(_.getInt(1)).map(_.getString(2))).toMap
    // round-trip: concatenated tokens reconstruct the word stream
    assert(byDoc(1L).mkString == "hashjoin")
    assert(byDoc(1L) == refEncode("hash", Tokenize.FixedMerges) ++
      refEncode("join", Tokenize.FixedMerges))
    assert(byDoc(2L) == Seq("batch", "scan", "hash"))
    assert(!byDoc.contains(3L) && !byDoc.contains(4L) && !byDoc.contains(5L))
  }

  test("property: encode == reference under RANDOM well-formed merge tables") {
    import spark.implicits._
    // 6 independently-grown random merge tables (each operand drawn
    // from base chars + earlier merge results, duplicates rejected —
    // the well-formedness invariant the trainer guarantees), each
    // against 60 random words incl. pathological repeats. The engine
    // expression and the buffer-based reference share no code.
    val rnd = new scala.util.Random(20260814)
    val alphabet = "abcdehor01"
    (1 to 6).foreach { trial =>
      val avail = scala.collection.mutable.ArrayBuffer[String](
        alphabet.map(_.toString): _*)
      val made = scala.collection.mutable.Set[String](avail.toSeq: _*)
      val merges = scala.collection.mutable.ArrayBuffer[(String, String)]()
      while (merges.size < 12) {
        val l = avail(rnd.nextInt(avail.size))
        val r = avail(rnd.nextInt(avail.size))
        if (!made(l + r) && (l + r).length <= 8) {
          merges += ((l, r)); avail += (l + r); made += (l + r)
        }
      }
      val words = Seq("aaaaaa", "abab", "deed", "o0o0o") ++
        (1 to 56).map(_ => (1 to rnd.nextInt(10) + 1)
          .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
      val df = words.zipWithIndex.map { case (w, i) => (i.toLong, w) }
        .toDF("doc_id", "text")
      val got = df.select(col("doc_id"),
          ops.Tokenize.encodeExpr("text", merges.toSeq).as("t"))
        .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
      words.zipWithIndex.foreach { case (w, i) =>
        assert(got(i.toLong) == refEncode(w, merges.toSeq),
          s"trial $trial word $w merges ${merges.mkString(" ")}")
      }
    }
  }

  test("vocab ids are dense, unique, and stable under the frozen merges") {
    val v = Tokenize.vocab(Tokenize.FixedMerges)
    assert(v.map(_._2) == v.indices)
    assert(v.map(_._1).distinct.size == v.size)
    assert(v.size == 36 + Tokenize.FixedMerges.size)
    assert(v.take(2) == Seq("0" -> 0, "1" -> 1))
  }

  test("encode is a streaming-scan shape: no shuffle before the explode") {
    val df = Tables.documents(spark, "/root/testdata/sf0.001")
    val plan = df.select(Tokenize.encodeExpr("text", Tokenize.FixedMerges))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"encode should not shuffle:\n$plan")
  }
}
