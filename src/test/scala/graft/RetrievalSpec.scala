package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Retrieval

/** BM25 over the persisted inverted index: ranking sanity on a planted
  * corpus (classic log-idf scoring), agreement between the classic and
  * the exact-rational oracle form where scores are well-separated, and
  * incremental index growth (df/N/avgdl must reflect appended batches
  * exactly — equal to a from-scratch rebuild).
  */
class RetrievalSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.extensions", "graft.GraftExtensions")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def tmp() = Files.createTempDirectory("bm25").toString

  private def docs(rows: (Long, String)*): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private val corpus = docs(
    1L -> "spark spark spark stream",
    2L -> "spark hash join",
    3L -> "hash hash hash join join hash join hash join hash",
    4L -> "sort merge window sort",
    5L -> "the quick brown fox")

  test("classic BM25 ranks the term-dense short doc first") {
    val t = Retrieval.buildIndex(spark, tmp() + "/idx", corpus)
    import spark.implicits._
    val top = Retrieval.bm25(spark, t, Seq(1 -> "spark"), 3)
      .select($"doc_id", $"rank").as[(Long, Int)].collect().toSeq.sortBy(_._2)
    // doc 1 has tf=3 of 'spark' in a short doc; doc 2 tf=1 — 1 before 2;
    // docs without the term never appear
    assert(top.map(_._1) == Seq(1L, 2L))
  }

  test("rational scoring agrees with classic ranking on separated scores") {
    val t = Retrieval.buildIndex(spark, tmp() + "/idx", corpus)
    import spark.implicits._
    val qs = Seq(1 -> "spark", 2 -> "hash", 2 -> "join", 3 -> "sort", 3 -> "merge")
    val classic = Retrieval.bm25(spark, t, qs, 5)
      .select($"qid", $"doc_id", $"rank").as[(Int, Long, Int)].collect().toSet
    val rational = Retrieval.searchRational(spark, t, qs, 5)
      .select($"qid", $"doc_id", $"rank").as[(Int, Long, Int)].collect().toSet
    assert(classic == rational)
  }

  test("rational contribution matches the closed-form integer formula") {
    val t = Retrieval.buildIndex(spark, tmp() + "/idx", corpus)
    import spark.implicits._
    // single-term query 'stream': only doc 1 matches (tf=1, dl=4);
    // corpus: N=5 docs, L=4+3+10+4+4=25 tokens, df=1
    val got = Retrieval.searchRational(spark, t, Seq(9 -> "stream"), 1)
      .select($"doc_id", $"score").as[(Long, Long)].collect().toSeq
    val (nD, lT, dfT, tf, dl) = (5L, 25L, 1L, 1L, 4L)
    val num = BigInt(1000000) * (2 * nD - 2 * dfT + 1) * 22 * tf * lT
    val den = BigInt(2 * dfT + 1) * (10 * tf * lT + 3 * lT + 9 * dl * nD)
    assert(got == Seq((1L, (num / den).toLong)))
  }

  test("incremental batch equals a from-scratch rebuild (stats included)") {
    val batch1 = docs(
      1L -> "spark stream",
      2L -> "hash join spark")
    val batch2 = docs(
      3L -> "spark spark spark",
      4L -> "join join hash window")
    val grown = Retrieval.buildIndex(spark, tmp() + "/idx1", batch1)
    Retrieval.indexBatch(spark, grown, batch2)
    val rebuilt = Retrieval.buildIndex(spark, tmp() + "/idx2",
      batch1.unionByName(batch2))
    import spark.implicits._
    val qs = Seq(1 -> "spark", 2 -> "join", 2 -> "hash")
    def run(t: graft.lake.LakeTable) =
      Retrieval.searchRational(spark, t, qs, 10)
        .select($"qid", $"doc_id", $"score", $"rank")
        .as[(Int, Long, Long, Int)].collect().toSet
    assert(run(grown) == run(rebuilt),
      "appended index must score identically to a full rebuild")
    assert(run(grown).nonEmpty)
  }

  test("indexBatch is append-only: a re-ingested doc_id fails loud") {
    val t = Retrieval.buildIndex(spark, tmp() + "/idx", corpus)
    val e = intercept[IllegalArgumentException] {
      Retrieval.indexBatch(spark, t, docs(2L -> "entirely new text"))
    }
    assert(e.getMessage.contains("reindexBatch"))
  }

  test("changed-doc reindex equals a from-scratch rebuild of the mutated corpus") {
    val base = docs(
      1L -> "spark stream spark",
      2L -> "hash join quorum quorum",   // 'quorum' exists ONLY here
      3L -> "sort merge window")
    val idx = Retrieval.buildIndex(spark, tmp() + "/idx1", base)
    // doc 2 changes completely (drops hash/join/quorum, gains spark/scan)
    // and doc 9 is genuinely new — one mixed reindex batch
    val mutated = docs(
      2L -> "spark scan scan",
      9L -> "window window join")
    Retrieval.reindexBatch(spark, idx, mutated)
    val rebuilt = Retrieval.buildIndex(spark, tmp() + "/idx2", docs(
      1L -> "spark stream spark",
      2L -> "spark scan scan",
      3L -> "sort merge window",
      9L -> "window window join"))
    import spark.implicits._
    val qs = Seq(1 -> "spark", 2 -> "join", 3 -> "scan", 4 -> "quorum")
    def run(t: graft.lake.LakeTable) =
      Retrieval.searchRational(spark, t, qs, 10)
        .select($"qid", $"doc_id", $"score", $"rank")
        .as[(Int, Long, Long, Int)].collect().toSet
    val got = run(idx)
    assert(got == run(rebuilt),
      "reindexed index must score identically to a full rebuild")
    assert(!got.exists(_._1 == 4),
      "postings of a dropped term must be deleted by reindex")
    assert(got.exists(_._1 == 3), "the new version's terms must be live")
  }

  test("zero-term docs count in stats, guard re-ingest, and reindex cleanly") {
    val base = docs(
      1L -> "spark stream spark",
      2L -> "12345 !!!")             // no extractable [a-z] terms at all
    val idx = Retrieval.buildIndex(spark, tmp() + "/idx1", base)
    // the zero-term doc must have a side-table row: its re-ingest is a
    // loud append-only violation, not a silent N/avgdl double-count
    val e = intercept[IllegalArgumentException] {
      Retrieval.indexBatch(spark, idx, docs(2L -> "now with words"))
    }
    assert(e.getMessage.contains("reindexBatch"))
    // reindexing it to HAVE terms equals a from-scratch rebuild
    Retrieval.reindexBatch(spark, idx, docs(2L -> "join join hash"))
    val rebuilt = Retrieval.buildIndex(spark, tmp() + "/idx2", docs(
      1L -> "spark stream spark",
      2L -> "join join hash"))
    import spark.implicits._
    val qs = Seq(1 -> "spark", 2 -> "join")
    def run(t: graft.lake.LakeTable) =
      Retrieval.searchRational(spark, t, qs, 10)
        .select($"qid", $"doc_id", $"score", $"rank")
        .as[(Int, Long, Long, Int)].collect().toSet
    assert(run(idx) == run(rebuilt),
      "reindexed zero-term doc must score identically to a rebuild")
    // and the reverse direction: a doc reindexed down to ZERO terms
    // still counts in N and its old postings are fully deleted
    Retrieval.reindexBatch(spark, idx, docs(2L -> "..."))
    val rebuilt2 = Retrieval.buildIndex(spark, tmp() + "/idx3", docs(
      1L -> "spark stream spark",
      2L -> "..."))
    assert(run(idx) == run(rebuilt2),
      "reindex down to zero terms must equal a rebuild of that corpus")
  }

  test("an index missing its doc side table fails with a diagnosis") {
    val t = Retrieval.buildIndex(spark, tmp() + "/idx", corpus)
    val side = new org.apache.hadoop.fs.Path(t.config.root + "_docs")
    side.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(side, true)
    val e = intercept[IllegalArgumentException] {
      Retrieval.indexBatch(spark, t, docs(99L -> "new doc"))
    }
    assert(e.getMessage.contains("doc side table"),
      s"expected the rebuild diagnosis, got: ${e.getMessage}")
    val e2 = intercept[IllegalArgumentException] {
      Retrieval.reindexBatch(spark, t, docs(1L -> "changed"))
    }
    assert(e2.getMessage.contains("doc side table"))
  }

  test("RRF fusion: doc in both lists beats equal-rank doc in one list") {
    import spark.implicits._
    // qid 1: doc 10 ranks 1st in both lists; doc 20 ranks 2nd in one
    val a = Seq((1, 10L, 1), (1, 20L, 2)).toDF("qid", "doc_id", "rank")
    val b = Seq((1, 10L, 1), (1, 30L, 2)).toDF("qid", "doc_id", "rank")
    val fused = Retrieval.rrfFuse(Seq(a, b), 10)
      .select($"doc_id", $"score", $"rank").as[(Long, Long, Int)]
      .collect().toSeq.sortBy(_._3)
    // 1000000/61 = 16393 (twice for doc 10); 1000000/62 = 16129 once
    assert(fused == Seq((10L, 2 * 16393L, 1), (20L, 16129L, 2), (30L, 16129L, 3)))
  }

  test("query for an absent term returns no rows (and does not error)") {
    val t = Retrieval.buildIndex(spark, tmp() + "/idx", corpus)
    assert(Retrieval.searchRational(spark, t, Seq(1 -> "zzzznotaterm"), 5)
      .count() == 0)
  }
}
