package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Prep

/** Edge semantics of the prep operators: chunk boundaries/overlap, empty
  * documents, redaction precision (scrubs PII, never clean text), and
  * quantization range/sign/zero-vector behavior.
  */
class PrepSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("chunk: overlap repeats boundary tokens; no pure-overlap tail chunk") {
    import spark.implicits._
    val d = Seq((1L, "a b c d e f g")).toDF("doc_id", "text")
    val out = Prep.chunk(d, "text", window = 3, overlap = 1)
      .select($"start", $"n_tokens", $"chunk").as[(Int, Int, String)]
      .collect().sortBy(_._1)
    // a start at 7 would re-emit only "g", already carried by (5,"e f g")
    assert(out.toSeq == Seq((1, 3, "a b c"), (3, 3, "c d e"), (5, 3, "e f g")))
    // a genuinely short tail (not contained in its predecessor) survives
    val d2 = Seq((1L, "a b c d e f g h")).toDF("doc_id", "text")
    val out2 = Prep.chunk(d2, "text", window = 3, overlap = 1)
      .select($"start", $"n_tokens", $"chunk").as[(Int, Int, String)]
      .collect().sortBy(_._1)
    assert(out2.toSeq == Seq((1, 3, "a b c"), (3, 3, "c d e"),
      (5, 3, "e f g"), (7, 2, "g h")))
  }

  test("chunk: empty and whitespace-only docs yield one empty chunk") {
    import spark.implicits._
    val d = Seq((1L, ""), (2L, "   ")).toDF("doc_id", "text")
    val out = Prep.chunk(d, "text", window = 5, overlap = 0)
      .select($"doc_id", $"n_tokens", $"chunk").as[(Long, Int, String)]
      .collect().toSet
    assert(out == Set((1L, 0, ""), (2L, 0, "")))
  }

  test("chunk: invalid window/overlap rejected") {
    import spark.implicits._
    val d = Seq((1L, "x")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] { Prep.chunk(d, "text", 5, 5) }
    intercept[IllegalArgumentException] { Prep.chunk(d, "text", 0, 0) }
  }

  test("redactPii scrubs each PII kind and leaves clean text alone") {
    import spark.implicits._
    val rows = Seq(
      "write to jo.smith+x@sub.example.co today",
      "call 415-555-1212 or 415.555.1212",
      "host 192.168.0.1 responded",
      "version 1.2 cost 3.456 and 12-34 stay put",
      "no pii here at all")
    val out = rows.toDF("t").select(Prep.redactPii($"t")).as[String].collect()
    assert(out(0) == "write to <EMAIL> today")
    assert(out(1) == "call <PHONE> or <PHONE>")
    assert(out(2) == "host <IP> responded")
    assert(out(3) == rows(3), "near-miss numerics must be untouched")
    assert(out(4) == rows(4))
  }

  test("packSequences: budget respected, oversized docs isolated, deterministic") {
    import spark.implicits._
    val docs = (1L to 400L).map(i => (i, if (i % 97 == 0) 500L else (i % 90) + 1))
      .toDF("doc_id", "tok")
    def run(parts: Int) = graft.ops.Prep.packSequences(
        docs.repartition(parts), "doc_id", "tok", budget = 256, buckets = 4)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val a = run(1)
    assert(run(13) == a && run(32) == a, "assignment must not depend on input partitioning")
    assert(a.size == 400, "every doc packed exactly once")
    // per-sequence budget: only sequences holding a single oversized doc may exceed
    val toks = docs.as[(Long, Long)].collect().toMap
    val bySeq = a.toSeq.groupBy(_._2).map { case (k, v) => k -> v.map(x => toks(x._1)) }
    bySeq.foreach { case (seqKey, ts) =>
      assert(ts.sum <= 256 || ts.size == 1,
        s"sequence $seqKey over budget with ${ts.size} docs: $ts")
    }
    // the oversized docs (tok=500) sit alone
    a.filter { case (id, _) => id % 97 == 0 }.foreach { case (id, seqKey) =>
      assert(bySeq(seqKey) == Seq(500L), s"oversized doc $id must be alone")
    }
  }

  test("quantizeInt8: range, sign, max element, zero vector") {
    import spark.implicits._
    val d = Seq(
      (1L, Seq(0.5f, -1.0f, 0.25f)),   // m=1.0 → 63, -127, 31
      (2L, Seq(0.0f, 0.0f)),           // zero vector → zeros
      (3L, Seq(2.0f))                  // single max → 127
    ).toDF("id", "emb")
    val out = d.select($"id", Prep.quantizeInt8($"emb").as("q"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(out(1L) == Seq(63L, -127L, 31L))
    assert(out(2L) == Seq(0L, 0L))
    assert(out(3L) == Seq(127L))
    assert(out.values.flatten.forall(q => q >= -127 && q <= 127))
  }
}
