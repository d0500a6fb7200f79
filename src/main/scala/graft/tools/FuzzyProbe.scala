package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch diagnostic (r17): stage costs of the deletion-neighborhood
  * fuzzy join — band explode, hash join + verify, distinct, final agg. */
object FuzzyProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed(tag: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = body
      println(f"[fuzzy] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    val names = graft.Tables.customer(spark, sfDir)
      .select(col("c_custkey").as("id"), col("c_name").as("s"))
    val bands = names.select(col("id"), col("s"), explode(expr(
      """array_distinct(concat(array(s),
           transform(sequence(1, length(s)),
             i -> concat(substring(s, 1, i - 1),
                         substring(s, i + 1, length(s))))))""")).as("variant"))
      .select(col("id"), col("s"), xxhash64(col("variant")).as("vh"))
    timed("bands")(bands.count())
    val joined = bands.as("a").join(bands.as("b"),
      col("a.vh") === col("b.vh") && col("a.id") =!= col("b.id"))
    timed("join raw")(joined.count())
    val verified = joined.filter(levenshtein(col("a.s"), col("b.s"), 1) >= 0)
      .select(col("a.id").as("id_a"), col("a.s").as("s_a"),
        col("b.id").as("id_b"), col("b.s").as("s_b"))
    timed("join+verify")(verified.count())
    timed("  +distinct")(verified.distinct().count())
    timed("full query (count)")(
      graft.SparkEntry.queries("fuzzy_name_pairs")(spark, sfDir).count())
    // expression-cost isolation over the same 1.95M joined pairs
    timed("verify=length-eq")(joined
      .filter(length(col("a.s")) === length(col("b.s"))).count())
    timed("verify=lev-no-threshold")(joined
      .filter(levenshtein(col("a.s"), col("b.s")) <= 1).count())
    timed("verify=lev-threshold(1)")(joined
      .filter(levenshtein(col("a.s"), col("b.s"), 1) >= 0).count())
    // parallelism experiment: the scan has ~3 splits, so the whole
    // explode+join+verify chain runs on 3 cores; spread by band hash
    val bandsR = bands.repartition(
      spark.sparkContext.defaultParallelism, col("vh"))
    val fullR = bandsR.as("a").join(bandsR.as("b"),
        col("a.vh") === col("b.vh") && col("a.id") =!= col("b.id"))
      .filter(levenshtein(col("a.s"), col("b.s"), 1) >= 0)
      .select(col("a.id").as("id_a"), col("a.s").as("s_a"),
        col("b.id").as("id_b"), col("b.s").as("s_b"))
      .distinct()
      .groupBy(col("id_a"), col("s_a")).agg(count(lit(1)).as("n"))
    timed("full-with-repart")(fullR.count())
    timed("full-with-repart again")(fullR.count())
    spark.stop()
  }
}
