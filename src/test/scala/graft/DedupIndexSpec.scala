package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.MinHashDedupIndex

/** Incremental MinHash dedup index (VERDICT r4 item #4): new batches
  * dedup against a PERSISTED signature index — planted cross-batch
  * duplicates are caught without rescanning the corpus, survivors (and
  * only survivors) extend the index, and the probe is partition-pruned.
  */
class DedupIndexSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.extensions", "graft.GraftExtensions")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def freshRoot(): String =
    Files.createTempDirectory("dedupidx").resolve("idx").toString

  private def docs(rows: (Long, String)*): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  /** distinct filler docs — long enough to shingle, mutually dissimilar */
  private def filler(ids: Range): Seq[(Long, String)] =
    ids.map(i => i.toLong ->
      (s"unique document body $i with subject s$i verb v$i object o$i " +
        s"extra token t${i * 31} tail t${i * 17}"))

  private def verdicts(r: DataFrame): Map[Long, Option[Long]] =
    r.collect().map(x =>
      x.getLong(0) -> (if (x.isNullAt(1)) None else Some(x.getLong(1)))).toMap

  test("cross-batch duplicates are caught; survivors extend the index") {
    val idx = new MinHashDedupIndex(spark, freshRoot())
    val base = filler(0 until 20)
    val r1 = verdicts(idx.ingest(docs(base: _*)))
    assert(r1.size == 20 && r1.values.forall(_.isEmpty),
      "distinct batch-1 docs must all survive")
    // batch 2: verbatim copy of doc 3, near-copy of doc 7, one fresh doc
    val near7 = base(7)._2 + " appended"
    val r2 = verdicts(idx.ingest(docs(
      (100L, base(3)._2), (101L, near7), (102L, filler(900 to 900).head._2))))
    assert(r2(100L).contains(3L), s"verbatim cross-batch copy: ${r2(100L)}")
    assert(r2(101L).contains(7L), s"near cross-batch copy: ${r2(101L)}")
    assert(r2(102L).isEmpty, "the fresh doc must survive")
    // duplicates are NOT indexed; survivors are: a copy of the dropped
    // doc 100 must dup to the CANONICAL 3, a copy of survivor 102 to 102
    val r3 = verdicts(idx.ingest(docs(
      (200L, base(3)._2), (201L, filler(900 to 900).head._2))))
    assert(r3(200L).contains(3L))
    assert(r3(201L).contains(102L),
      "batch-2 survivor must have been indexed")
  }

  test("in-batch duplicates resolve to the smallest id, one pass") {
    val idx = new MinHashDedupIndex(spark, freshRoot())
    val t = "the very same sentence repeated across three documents today"
    val r = verdicts(idx.ingest(docs(
      (Seq((5L, t), (9L, t), (2L, t)) ++ filler(50 until 55)): _*)))
    assert(r(5L).contains(2L) && r(9L).contains(2L) && r(2L).isEmpty)
  }

  test("probe reads only colliding partitions, not the whole index") {
    val idx = new MinHashDedupIndex(spark, freshRoot())
    idx.ingest(docs(filler(0 until 200): _*)) // index spread over buckets
    idx.ingest(docs((1000L, filler(3 to 3).head._2)))
    assert(idx.lastProbeFiles > 0, "the single-doc probe must scan something")
    assert(idx.lastProbeFiles < idx.lastIndexFiles,
      s"a 1-doc probe (≤4 band buckets) scanned ${idx.lastProbeFiles} of " +
        s"${idx.lastIndexFiles} index files — probe must be partition-pruned")
  }

  test("verify join is key-addressed: reads don't grow with uninvolved corpus") {
    val idx = new MinHashDedupIndex(spark, freshRoot())
    // three disjoint 6-digit id regions → files with cleanly separated
    // string key ranges in the `docs` forward index
    idx.ingest(docs(filler(100000 until 100200): _*))
    idx.ingest(docs(filler(500000 until 500200): _*))
    // probe 1: a verbatim copy of a region-A doc — the verify lookup must
    // resolve partner 100003 through region-A files only
    idx.ingest(docs((700000L, filler(100003 to 100003).head._2)))
    val v1 = idx.lastVerifyFiles
    val docsAtProbe1 = idx.lastDocsFiles
    assert(v1 > 0, "the verify lookup must scan the partner's file")
    assert(v1 < docsAtProbe1,
      s"verify scanned $v1 of $docsAtProbe1 docs files — must be key-range pruned")
    // grow an UNINVOLVED region, then re-probe the same region-A doc:
    // verify reads must not grow with the new files
    idx.ingest(docs(filler(900000 until 900200): _*))
    idx.ingest(docs((700001L, filler(100003 to 100003).head._2)))
    assert(idx.lastDocsFiles > docsAtProbe1, "the index must have grown")
    assert(idx.lastVerifyFiles <= v1,
      s"verify reads grew ${v1} -> ${idx.lastVerifyFiles} after ingesting " +
        "an uninvolved id region — the lookup is not key-addressed")
  }

  test("empty-shingle docs never match anything") {
    val idx = new MinHashDedupIndex(spark, freshRoot())
    val r = verdicts(idx.ingest(docs(
      (Seq((1L, "too short"), (2L, "too short")) ++ filler(10 until 13)): _*)))
    assert(r(1L).isEmpty && r(2L).isEmpty,
      "sub-shingle docs have empty sets: Jaccard undefined, not 1.0")
  }
}
