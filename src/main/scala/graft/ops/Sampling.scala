package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.{GQuery, Tables => T}

/** Deterministic sampling/splitting for training-data pipelines.
  *
  * `randomSplit`/`sample` are NOT reproducible at scale: their per-
  * partition RNG re-deals rows whenever partitioning, file order, or
  * parallelism changes — a re-run of a 100 TB pipeline silently moves
  * documents between train and test. The standard fix (what every large
  * corpus pipeline does) is content-addressed assignment: a salted hash
  * of a stable id decides the bucket, so membership is a pure per-row
  * function — same row, same split, on any cluster shape, forever, and
  * adding data never reshuffles existing assignments. Pure codegen'd
  * expressions: no shuffle, no UDF, no state.
  *
  * The hash is md5 (first 8 hex digits → bucket in [0, 10000)): md5 is
  * bit-identical across engines, which makes every assignment DuckDB-
  * oracle-checkable — and portable to any downstream system that wants
  * to recompute membership.
  */
object Sampling {

  val Buckets = 10000

  /** salted content-addressed bucket in [0, Buckets) */
  def hashBucket(id: Column, salt: String): Column =
    conv(substring(md5(concat(id.cast("string"), lit(":" + salt))), 1, 8), 16, 10)
      .cast("long") % Buckets

  /** Assign each row to a named split by cumulative weight (e.g.
    * ("train",0.8),("val",0.1),("test",0.1)). Thresholds are fixed in
    * integer bucket space, so the boundaries are exact and the
    * assignment is reproducible independently of float rounding.
    */
  def assignSplit(
      df: DataFrame, idCol: String,
      splits: Seq[(String, Double)], salt: String = "split"): DataFrame = {
    require(splits.nonEmpty && math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      s"split weights must sum to 1, got $splits")
    val b = hashBucket(col(idCol), salt)
    val thresholds = splits.scanLeft(0L) {
      case (acc, (_, w)) => acc + math.round(w * Buckets)
    }.tail
    val assign = splits.zip(thresholds).dropRight(1)
      .foldRight(lit(splits.last._1)) { case (((name, _), cut), acc) =>
        when(b < cut, name).otherwise(acc)
      }
    df.withColumn("split", assign)
  }

  /** Keep a per-stratum deterministic fraction of rows (downsample the
    * over-represented strata of a corpus — the language/source rebalance
    * step of a training mix). A row survives iff its salted hash bucket
    * falls below `rate(stratum) * Buckets`; unlisted strata use
    * `defaultRate`. Per-row filter, no shuffle, no sampleBy RNG drift.
    */
  def stratifiedSample(
      df: DataFrame, idCol: String, strataCol: String,
      rates: Map[String, Double], defaultRate: Double,
      salt: String = "strata"): DataFrame = {
    val cut = rates.foldRight(
        lit(math.round(defaultRate * Buckets)): Column) {
      case ((stratum, rate), acc) =>
        when(col(strataCol) === stratum, math.round(rate * Buckets)).otherwise(acc)
    }
    df.filter(hashBucket(col(idCol), salt) < cut)
  }

  /** Deterministic domain mixing: downsample each domain so the KEPT
    * corpus approaches the target mixture `weights` (integer parts of a
    * whole, e.g. en:50, zh:20, …) — the pretraining "data mix" step.
    *
    * The achievable mixture is capped by the scarcest domain: with
    * W = Σweights, the largest feasible total is
    * `T = min_s floor(n_s·W/w_s)` (taking more would need more of some
    * domain than exists). Each domain then keeps
    * `cut_s = floor(B·w_s·T / (W·n_s))` of its B hash buckets. All
    * arithmetic is BIGINT — `div`, never floats — so the kept set is
    * bit-reproducible and cross-engine checkable. Domains without a
    * weight are dropped (weight 0).
    *
    * Plan shape at 100 TB: one map-side-combined count per domain
    * (|domains| rows), a scalar min, a broadcast join of the cuts, and
    * a codegen'd per-row md5 filter — the corpus itself never shuffles.
    */
  def domainMix(
      df: DataFrame, idCol: String, domainCol: String,
      weights: Map[String, Int], salt: String = "mix"): DataFrame = {
    require(weights.nonEmpty && weights.values.forall(_ > 0),
      s"domain weights must be positive, got $weights")
    // ONE map-side-combined count per domain, collected at
    // METADATA scale (|domains| rows — the IVF-centroid pattern, not a
    // data collect); T and the cuts then compute in driver-side BigInt,
    // so the arithmetic is exact at ANY corpus size (a 64-bit
    // Buckets·w·T product overflows around trillion-row domains) and a
    // weighted domain absent from the corpus fails LOUD instead of
    // silently skewing the mix toward the present ones.
    val counts: Map[String, Long] =
      df.filter(col(domainCol).isin(weights.keys.toSeq: _*))
        .groupBy(col(domainCol)).count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val missing = weights.keySet -- counts.keySet
    require(missing.isEmpty,
      s"weighted domains absent from the corpus: ${missing.mkString(",")}")
    val W = weights.values.map(BigInt(_)).sum
    val t = weights.map { case (dom, w) => BigInt(counts(dom)) * W / w }.min
    val cutOf: Map[String, Long] = weights.map { case (dom, w) =>
      dom -> (BigInt(Buckets) * w * t / (W * counts(dom))).toLong
    }
    // unweighted domains fall through to cut -1: kept never
    val cut = cutOf.foldRight(lit(-1L): Column) { case ((dom, c), acc) =>
      when(col(domainCol) === dom, c).otherwise(acc)
    }
    df.filter(hashBucket(col(idCol), salt) < cut)
  }

  /** Deterministic corpus shuffle for training order: a content-
    * addressed sort key (md5 of seed-salted id) plus a 256-way shuffle
    * bucket (first key byte) for file grouping. The GLOBAL ordering is
    * the sort on `shuffle_key` — at 100 TB that is Spark's range-
    * partitioned total sort (sample → range exchange → per-partition
    * sort), and the data loader replays epoch order by reading bucket
    * files in key order. Deliberately NOT a row_number() rank: a global
    * rank needs either a single-partition window (driver-shaped
    * bottleneck) or a two-pass offset join — the key IS the rank for
    * every downstream purpose (repartition-invariant, stable under
    * corpus growth, and a different `seed` reshuffles every epoch).
    */
  def shuffle(df: DataFrame, idCol: String, seed: String): DataFrame =
    df.withColumn("shuffle_key",
        md5(concat(col(idCol).cast("string"), lit(s":$seed"))))
      .withColumn("shuffle_bucket",
        conv(substring(col("shuffle_key"), 1, 2), 16, 10).cast("int"))
      .orderBy("shuffle_key")

  // ---- fixture queries ------------------------------------------------

  /** oracle-side rendering of [[hashBucket]] (same md5/substr formula) */
  private def sqlBucket(id: String, salt: String): String =
    s"('0x' || substr(md5($id::VARCHAR || ':$salt'), 1, 8))::BIGINT % $Buckets"

  val queries: Seq[GQuery] = Seq(

    GQuery("doc_shuffle",
      (s, d) => shuffle(T.documents(s, d).select(col("doc_id")), "doc_id", "ep1"),
      Some("""SELECT doc_id,
          md5(doc_id::VARCHAR || ':ep1') AS shuffle_key,
          CAST(('0x' || substr(md5(doc_id::VARCHAR || ':ep1'), 1, 2)) AS INT)
            AS shuffle_bucket
        FROM documents ORDER BY shuffle_key""")),

    GQuery("doc_split_assign",
      (s, d) => assignSplit(
        T.documents(s, d).select(col("doc_id")), "doc_id",
        Seq(("train", 0.8), ("val", 0.1), ("test", 0.1)))
        .orderBy("doc_id"),
      Some(s"""SELECT doc_id,
          CASE WHEN ${sqlBucket("doc_id", "split")} < 8000 THEN 'train'
               WHEN ${sqlBucket("doc_id", "split")} < 9000 THEN 'val'
               ELSE 'test' END AS split
        FROM documents ORDER BY doc_id""")),

    GQuery("doc_stratified_sample",
      (s, d) => stratifiedSample(
        T.documents(s, d).select(col("doc_id"), col("lang")),
        "doc_id", "lang",
        rates = Map("en" -> 0.25, "zh" -> 0.5), defaultRate = 1.0)
        .orderBy("doc_id"),
      Some(s"""SELECT doc_id, lang FROM documents
        WHERE ${sqlBucket("doc_id", "strata")} <
          CASE lang WHEN 'en' THEN 2500 WHEN 'zh' THEN 5000 ELSE $Buckets END
        ORDER BY doc_id""")),

    // target mix 50/20/10/10/10 over lang; the scarcest domain caps the
    // total and every other domain downsamples toward the target shares
    GQuery("doc_domain_mix",
      (s, d) => domainMix(
        T.documents(s, d).select(col("doc_id"), col("lang")),
        "doc_id", "lang",
        weights = Map("en" -> 50, "zh" -> 20, "de" -> 10, "es" -> 10, "fr" -> 10))
        .orderBy("doc_id"),
      Some(s"""WITH w(dom, wt) AS (VALUES
          ('en', CAST(50 AS BIGINT)), ('zh', 20), ('de', 10), ('es', 10), ('fr', 10)),
        c AS (SELECT lang AS dom, count(*)::BIGINT AS n
              FROM documents WHERE lang IN ('en','zh','de','es','fr') GROUP BY 1),
        j AS (SELECT c.dom, c.n, w.wt FROM c JOIN w USING (dom)),
        t AS (SELECT min(n * 100 // wt) AS tt FROM j),
        cuts AS (SELECT dom, ($Buckets * wt * tt) // (100 * n) AS cut FROM j, t)
        SELECT d.doc_id, d.lang FROM documents d
        JOIN cuts ON d.lang = cuts.dom
        WHERE ${sqlBucket("d.doc_id", "mix")} < cuts.cut
        ORDER BY d.doc_id"""))
  )
}
