package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Sampling

/** The property that justifies hash splits over randomSplit: assignment
  * is a pure function of (id, salt) — invariant under repartitioning,
  * ordering, and re-runs — and split fractions land near their weights.
  */
class SamplingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def ids(n: Int) = {
    import spark.implicits._
    (1 to n).map(_.toLong).toDF("id")
  }

  test("split assignment is invariant under repartitioning and re-runs") {
    import spark.implicits._
    val splits = Seq(("train", 0.8), ("val", 0.1), ("test", 0.1))
    def assign(p: Int) = Sampling.assignSplit(ids(2000).repartition(p), "id", splits)
      .select($"id", $"split").as[(Long, String)].collect().toMap
    val a = assign(1)
    assert(assign(7) == a && assign(32) == a)
  }

  test("split fractions approximate the weights; every row assigned once") {
    import spark.implicits._
    val n = 20000
    val counts = Sampling.assignSplit(ids(n), "id",
        Seq(("train", 0.8), ("val", 0.1), ("test", 0.1)))
      .groupBy("split").count().as[(String, Long)].collect().toMap
    assert(counts.values.sum == n)
    assert(math.abs(counts("train") - 0.8 * n) < 0.02 * n)
    assert(math.abs(counts("val") - 0.1 * n) < 0.02 * n)
    assert(math.abs(counts("test") - 0.1 * n) < 0.02 * n)
  }

  test("stratified sample holds per-stratum rates and is deterministic") {
    import spark.implicits._
    val df = ids(10000).withColumn("g",
      when(col("id") % 2 === 0, "heavy").otherwise("light"))
    def run() = Sampling.stratifiedSample(df, "id", "g",
      Map("heavy" -> 0.1), defaultRate = 1.0)
    val kept = run().groupBy("g").count().as[(String, Long)].collect().toMap
    assert(kept("light") == 5000, "unlisted stratum keeps everything")
    assert(math.abs(kept("heavy") - 500) < 150)
    assert(run().select($"id").as[Long].collect().toSet ==
      run().select($"id").as[Long].collect().toSet)
  }

  test("domain mix: kept corpus approaches the target shares; scarcest domain caps") {
    import spark.implicits._
    // 4000 a, 1000 b, 500 c; target 1:1:1 → b? no — c is scarcest:
    // T = min(4000*3/1, 1000*3/1, 500*3/1) = 1500, so ~500 of each
    val df = ((1 to 4000).map(i => (i.toLong, "a")) ++
      (10001 to 11000).map(i => (i.toLong, "b")) ++
      (20001 to 20500).map(i => (i.toLong, "c"))).toDF("id", "dom")
    val kept = Sampling.domainMix(df, "id", "dom",
      weights = Map("a" -> 1, "b" -> 1, "c" -> 1))
      .groupBy("dom").count().as[(String, Long)].collect().toMap
    // c keeps everything (cut = 10000 exactly); a and b downsample to ~500
    assert(kept("c") == 500L)
    assert(math.abs(kept("a") - 500L) < 120, s"got ${kept("a")}")
    assert(math.abs(kept("b") - 500L) < 120, s"got ${kept("b")}")
    // determinism: same inputs, same kept set, any partitioning
    val k1 = Sampling.domainMix(df.repartition(13), "id", "dom",
      weights = Map("a" -> 1, "b" -> 1, "c" -> 1))
      .select("id").as[Long].collect().toSet
    val k2 = Sampling.domainMix(df.repartition(3), "id", "dom",
      weights = Map("a" -> 1, "b" -> 1, "c" -> 1))
      .select("id").as[Long].collect().toSet
    assert(k1 == k2)
    // unweighted domains are dropped
    val noC = Sampling.domainMix(df, "id", "dom", weights = Map("a" -> 1, "b" -> 1))
    assert(noC.filter($"dom" === "c").isEmpty)
    // a weighted domain with no corpus rows fails LOUD — a typo'd name
    // must not silently skew the mix toward the present domains
    val ex = intercept[IllegalArgumentException] {
      Sampling.domainMix(df, "id", "dom", weights = Map("a" -> 1, "zz" -> 1))
    }
    assert(ex.getMessage.contains("zz"))
  }

  test("malformed weights are rejected") {
    intercept[IllegalArgumentException] {
      Sampling.assignSplit(ids(10), "id", Seq(("a", 0.5), ("b", 0.2)))
    }
  }

  test("shuffle: content-addressed permutation, seed-sensitive, partition-invariant") {
    import spark.implicits._
    def order(p: Int, seed: String) =
      Sampling.shuffle(ids(500).repartition(p), "id", seed)
        .select($"id").as[Long].collect().toSeq
    // a permutation: every row present exactly once, buckets in [0,255]
    val s1 = order(7, "ep1")
    assert(s1.sorted == (1L to 500L))
    val buckets = Sampling.shuffle(ids(500), "id", "ep1")
      .select($"shuffle_bucket").as[Int].collect()
    assert(buckets.forall(b => b >= 0 && b <= 255))
    // content-addressed: the epoch order is independent of partitioning
    assert(order(3, "ep1") == s1)
    // a different seed is a different epoch order (not the identity shift)
    assert(order(7, "ep2") != s1)
    // and genuinely shuffled: not the natural id order
    assert(s1 != (1L to 500L).toSeq)
  }
}
