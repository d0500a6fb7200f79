package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-honesty harness: replays the bench's most expensive queries
  * against a structure-preserving N× replica of the fixture dir and
  * reports per-query growth, so "no scale-killers" is a measured claim
  * (per-query time ≲ linear in data volume), not an eyeballed one.
  *
  * Replication must not change the DATA's pairwise statistics, or the
  * measurement confounds algorithmic cost with output growth:
  *
  *  - `customer`: keys offset per replica; names get a per-replica
  *    3-letter suffix whose pairwise Levenshtein distance is 3, so
  *    fuzzy-join (edit distance ≤ 1) neighborhoods never cross replicas
  *    — pair COUNT grows exactly N×, per-name candidate density stays
  *    constant.
  *  - `documents`: doc_ids offset; every whitespace token gets a
  *    per-replica suffix — word-trigram shingle sets are bijectively
  *    renamed within a replica (identical Jaccard structure) and
  *    disjoint across replicas (cross-replica similarity exactly 0).
  *  - `lineitem`: order keys offset per replica; the CDC replay's keyed
  *    row count grows exactly N×.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=32 \
  *          sbt "runMain graft.ScaleCheck 1 10 100"
  * Prints one JSON line per (query, mult) with steady-state seconds
  * (2nd run; the 1st warms fixture caches) and a final ratio line.
  * Mults ≥ ExtremeMult run only the single heaviest query against a
  * customer-only replica (the 100x point).
  */
object ScaleCheck {

  private val watched = Seq(
    "fuzzy_name_pairs", "doc_ngram_jaccard_pairs", "lake_tail_changes",
    "doc_minhash_pairs", "doc_contamination", "tbl_profile",
    // watermark-bounded stream-stream join: the scale claim under test is
    // that per-row cost stays constant because join STATE is bounded by
    // the watermark interval, not by stream volume
    "stream_interval_join",
    // r11: raw tokenizer throughput (per-row encode + explode + id join).
    // doc_curation_pipeline is deliberately NOT here: the replica's
    // token salting (required for pairwise isolation) suffixes every
    // word, so the quality stage's stopword ratio reads 0 and the
    // pipeline filters ALL replica docs — a 0-row plan measures
    // nothing. Its stages are audited individually instead (the
    // jaccard/cluster join at 10x AND 100x, the tokenizer here, the
    // pack shape via doc_seq_pack's content-hash streams).
    "doc_bpe_encode",
    // r11: DSIR selection — two vocabulary-scale scoring aggs feeding a
    // distributed top-fraction (sort+limit, no global window); the
    // sample size grows with the corpus, so the audit checks the
    // selection stays scan-bounded
    "doc_dsir_sample",
    // r11: the similarity family, enabled by the rotation-salted
    // embeddings replica. Isolation is threshold-relative: rotations
    // zero the cross-replica structure, but random 64-dim cosines are
    // N(0, 1/64) and the near-dup fixture's permissive τ=0.5 sits at
    // 4σ — the ~1.8e8 cross-replica pairs at 10× surface a few hundred
    // tail crossings (measured: 14 → 662 pairs), so the audit measures
    // a HEAVIER pair regime than exact m× growth; sub-linear time there
    // is the stronger claim. At production thresholds (≥0.9) the tail
    // is ~51σ — truly zero.
    "emb_neardup_lsh", "emb_ann_ivf",
    // r12: the typed change feed — per-commit cost adds a bounded key
    // join (post classification) and a semi-join (pre-images) to the
    // untyped tail; the audit checks the whole replay stays O(total
    // changes) like lake_tail_changes, not super-linear in commit size
    "lake_tail_cdf",
    // r14: the typed MoR feed — per commit ONE key-range-pruned read
    // semi-joined to the touched keys, then a single fused window chain
    // (pre+post merge + winner pivot over one sort). The audit checks
    // the replay stays O(total touched keys), like its CoW twin
    "lake_tail_cdf_mor",
    // r11: bloom point lookup — the candidate-pair join (probe keys ×
    // range-hit files) is the known hazard regime: on the full-span MoR
    // fixture EVERY file range-hits every probe, so pairs grow as
    // probes × files. The audit measures whether the bloom stage holds
    // that product in check at 10x
    "lake_bloom_lookup")

  /** At extreme mults (the 100x point) only the heaviest queries run,
    * and the replica builds only the tables they read (customer,
    * documents, lineitem — orders/events are skipped): r10 carried just
    * the fuzzy join here and its 100x audit caught a measured 15x
    * super-linearity; r11 adds the two next-riskiest —
    * doc_ngram_jaccard_pairs (the documented hot-shingle skew hazard)
    * and lake_tail_changes (2.2x at 10x, the closest to linear: the
    * replay must stay O(total changes) with flat per-commit overhead). */
  private val watchedExtreme =
    Seq("fuzzy_name_pairs", "doc_ngram_jaccard_pairs", "lake_tail_changes",
      // r11: the bloom point-lookup's candidate-pair join grows as
      // probes × files — ~10,000× more pairs at 100× than at 1× on the
      // full-span fixture; the 100× point tests whether the bloom stage
      // (and the merge behind it) holds that product in check
      "lake_bloom_lookup")
  private val ExtremeMult = 50

  /** Audit-only variants. The catalog's lake_tail_changes sinks to
    * `format("memory")` — the right harness for the DuckDB oracle (the
    * result must come back as a queryable DataFrame) but a
    * DRIVER-materializing shape: at 100x the memory sink collects the
    * whole ~40M-row tail as task results (found by this audit: 2.8 GiB
    * > maxResultSize). A production tail sinks distributively, so the
    * audit measures the replay with a parquet sink instead — the
    * engine-side cost (commit-log reads + per-commit file scans +
    * distributed write) with zero driver materialization. Applied at
    * EVERY mult so ratios compare like with like. */
  private def tailToParquet(s: SparkSession, d: String): DataFrame = {
    val t = ops.Lake.morCdcTable(s, d)
    val tag = d.replaceAll("[^A-Za-z0-9.]", "_")
    val out = s"/tmp/graft_scale_sink/tail_$tag"
    val ckpt = s"/tmp/graft_scale_sink/tail_ckpt_$tag"
    val fs = new org.apache.hadoop.fs.Path(out)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    Seq(out, ckpt).foreach(p =>
      fs.delete(new org.apache.hadoop.fs.Path(p), true))
    val q = t.tailStream().writeStream.outputMode("append")
      .option("checkpointLocation", ckpt)
      .format("parquet").option("path", out).start()
    try q.processAllAvailable() finally q.stop()
    s.read.parquet(out)
  }

  /** typed-CDF twin of [[tailToParquet]]: same distributed-sink rationale
    * (the catalog's memory sink is the oracle harness, not the
    * production shape), over the CoW CDC fixture with changeTypes on */
  private def cdfTailToParquet(s: SparkSession, d: String): DataFrame = {
    val t = ops.Lake.cdcTable(s, d)
    val tag = d.replaceAll("[^A-Za-z0-9.]", "_")
    val out = s"/tmp/graft_scale_sink/cdf_$tag"
    val ckpt = s"/tmp/graft_scale_sink/cdf_ckpt_$tag"
    val fs = new org.apache.hadoop.fs.Path(out)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    Seq(out, ckpt).foreach(p =>
      fs.delete(new org.apache.hadoop.fs.Path(p), true))
    val q = t.tailStream(changeTypes = true).writeStream.outputMode("append")
      .option("checkpointLocation", ckpt)
      .format("parquet").option("path", out).start()
    try q.processAllAvailable() finally q.stop()
    s.read.parquet(out)
  }

  /** typed-CDF MoR twin: the classification probes run against the MoR
    * CDC fixture's delta stack; same distributed-sink rationale */
  private def morCdfTailToParquet(s: SparkSession, d: String): DataFrame = {
    val t = ops.Lake.morCdcTable(s, d)
    val tag = d.replaceAll("[^A-Za-z0-9.]", "_")
    val out = s"/tmp/graft_scale_sink/cdfmor_$tag"
    val ckpt = s"/tmp/graft_scale_sink/cdfmor_ckpt_$tag"
    val fs = new org.apache.hadoop.fs.Path(out)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    Seq(out, ckpt).foreach(p =>
      fs.delete(new org.apache.hadoop.fs.Path(p), true))
    val q = t.tailStream(changeTypes = true).writeStream.outputMode("append")
      .option("checkpointLocation", ckpt)
      .format("parquet").option("path", out).start()
    try q.processAllAvailable() finally q.stop()
    s.read.parquet(out)
  }

  private val overrides: Map[String, (SparkSession, String) => DataFrame] =
    Map("lake_tail_changes" -> (tailToParquet _),
      "lake_tail_cdf" -> (cdfTailToParquet _),
      "lake_tail_cdf_mor" -> (morCdfTailToParquet _))

  def main(args: Array[String]): Unit = {
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val mults = (if (args.nonEmpty) args.toSeq.map(_.toInt) else Seq(1, 10)).sorted
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // let AQE size shuffles by BYTES, not by a fixed count: with the
      // count pinned at `cpus`, a 100x replica makes every partition
      // 100x bigger and the heaviest join spills — measured 15x time at
      // 10x data on the 100x point. A high initial count that AQE
      // coalesces down is the production posture (constant-size
      // partitions as data grows); small queries still end up at a
      // handful of partitions after coalescing.
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum", "1024")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val results = scala.collection.mutable.LinkedHashMap[(String, Int), Double]()
    for (m <- mults) {
      val dir = replica(spark, base, m)
      // WEAK scaling at the big mults: hold per-partition shuffle volume
      // roughly constant by growing the partition count once the data
      // outgrows the baseline regime, as a real deployment sizes
      // spark.sql.shuffle.partitions to the data. A fixed count measures
      // spill-to-disk at 100x (first run: 22x time for 10x volume purely
      // from 32 partitions carrying 100x the bytes) — confounding the
      // algorithmic-growth question; but scaling at SMALL mults instead
      // measures tiny-partition scheduling overhead (320 partitions at
      // 10x: 7s → 54s). ≤10x keeps the baseline count so ratios stay
      // regime-comparable; beyond that, partitions grow with volume.
      spark.conf.set("spark.sql.shuffle.partitions",
        math.min(2048, cpus.toInt * math.max(1, m / 10)).toString)
      // dev-only filter (comma-separated names), mirroring Verify/Bench
      val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(',').toSet)
      for (name <- (if (m >= ExtremeMult) watchedExtreme else watched)
             .filter(n => only.forall(_.contains(n)))) {
        val fn = overrides.getOrElse(name, SparkEntry.queries(name))
        fn(spark, dir).count() // warm: fixture/index builds + page cache
        val t0 = System.nanoTime()
        val rows = fn(spark, dir).count()
        val sec = (System.nanoTime() - t0) / 1e9
        results((name, m)) = sec
        println(s"""{"scale_check":{"query":"$name","mult":$m,"sec":$sec,"rows":$rows}}""")
      }
    }
    for (name <- watched; w <- mults.sliding(2) if w.size == 2
         if results.contains((name, w.head)) && results.contains((name, w.last))) {
      val Seq(lo, hi) = w
      val growth = results((name, hi)) / results((name, lo))
      val volume = hi.toDouble / lo
      println(f"""{"scale_ratio":{"query":"$name","mult":"${lo}x->${hi}x","time_growth":$growth%.2f,"volume_growth":$volume%.1f,"linear_or_better":${growth <= volume * 1.3}}}""")
    }
    spark.stop()
  }

  /** Build (once per base-fixture generation) an m× replica of the
    * tables the watched queries read. Returns a dir laid out like a
    * driver SF dir. The done-marker stores a fingerprint of the base
    * fixtures (paths+sizes+mtimes), so a driver-side regeneration of
    * /root/testdata invalidates the cached replica instead of silently
    * measuring this round's queries against last round's data. */
  private def replica(spark: SparkSession, base: String, m: Int): String = {
    val dir = s"/tmp/graft_scale/${base.replaceAll("[^A-Za-z0-9.]", "_")}_x$m"
    val done = java.nio.file.Paths.get(s"$dir/_REPLICA_DONE")
    val fingerprint = {
      // layout version prefix: bumping it invalidates replicas built by
      // an older ScaleCheck whose extreme-mult dirs carried fewer
      // tables (r10 wrote only customer at 100x — a fingerprint match
      // alone would reuse that dir and fail on the missing tables)
      val layout = "layout-v3\n" // v3: + rotation-salted embeddings
      val root = java.nio.file.Paths.get(base)
      val walk = java.nio.file.Files.walk(root)
      try layout + walk.sorted().toArray.toSeq.map(_.asInstanceOf[java.nio.file.Path])
        .filter(java.nio.file.Files.isRegularFile(_))
        .map(p => s"$p:${java.nio.file.Files.size(p)}:" +
          s"${java.nio.file.Files.getLastModifiedTime(p).toMillis}")
        .mkString("\n")
      finally walk.close()
    }
    if (java.nio.file.Files.exists(done) &&
        java.nio.file.Files.readString(done) == fingerprint) return dir
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(dir), true)
    // Per-replica salts must be pairwise distinct and pairwise
    // Levenshtein ≥ 3 (so edit-distance-1 fuzzy neighborhoods never
    // cross replicas). Two-letter code, each letter tripled: salts
    // differing in either letter differ in a 3-letter block, and a
    // 3-letter block of one letter cannot be edited into another in < 3
    // ops — supports the 100x point (cap 26² = 676 replicas).
    require(m <= 676, s"replica() supports at most 676x, got $m")
    def salt(i: Int) = {
      val a = ('a' + i / 26).toChar; val b = ('a' + i % 26).toChar
      s"$a$a$a$b$b$b"
    }

    def replicate(t: DataFrame, keyCol: String,
                  perturb: (DataFrame, Int) => DataFrame): DataFrame = {
      val span = t.agg(max(col(keyCol))).head.getLong(0) + 1
      (0 until m).map { i =>
        perturb(t.withColumn(keyCol, col(keyCol) + lit(i * span)), i)
      }.reduce(_ unionAll _)
    }

    val cust = replicate(Tables.customer(spark, base), "c_custkey",
      (df, i) => df.withColumn("c_name", concat(col("c_name"), lit(" " + salt(i)))))
    cust.write.mode("overwrite").parquet(s"$dir/customer.parquet")

    // salt every maximal alphanumeric run IN PLACE (r → r+salt): a
    // bijective token rename under BOTH corpus tokenizations — the
    // whitespace-token trigram shingles (ops.Text.toks) and the
    // [a-z0-9]+ grams (ops.Hygiene) — so pairwise statistics are
    // preserved for every watched text query. A separator-joined salt
    // ("w§aaa") would split in two under the alphanumeric tokenizer and
    // double the gram stream, measuring a different workload.
    val docs = replicate(Tables.documents(spark, base), "doc_id",
      (df, i) => df
        .withColumn("text", regexp_replace(col("text"),
          "([A-Za-z0-9]+)", "$1" + salt(i)))
        .withColumn("n_chars", length(col("text")).cast("long")))
    val li = replicate(Tables.lineitem(spark, base), "l_orderkey",
      (df, _) => df)
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    li.write.mode("overwrite").parquet(s"$dir/lineitem.parquet")

    // extreme mults build ONLY the tables their watched queries read
    // (customer/documents/lineitem) — a 100x five-table replica build
    // would dwarf the measurement itself; see watchedExtreme
    if (m < ExtremeMult) {
      // orders: offset the customer key too so per-column distinct counts
      // (what tbl_profile aggregates) grow with volume like a real table
      val ords = {
        val custSpan = Tables.orders(spark, base)
          .agg(max(col("o_custkey"))).head.getLong(0) + 1
        replicate(Tables.orders(spark, base), "o_orderkey",
          (df, i) => df.withColumn("o_custkey",
            col("o_custkey") + lit(i * custSpan)))
      }
      // events: offset user_id per replica too, so the stream join's
      // per-user pair structure is copied verbatim into each replica
      // (pair count grows exactly m×, per-user candidate density
      // constant). The ts column keeps whatever physical encoding the
      // fixture has (ns-as-long stays LongType under the session's
      // nanosAsLong conf) — the stream queries normalize on read.
      val evs = {
        val userSpan = Tables.t(spark, base, "events")
          .agg(max(col("user_id"))).head.getLong(0) + 1
        replicate(Tables.t(spark, base, "events"), "event_id",
          (df, i) => df.withColumn("user_id",
            col("user_id") + lit(i * userSpan)))
      }
      ords.write.mode("overwrite").parquet(s"$dir/orders.parquet")
      evs.write.mode("overwrite").parquet(s"$dir/events.parquet")
      // embeddings: per-replica deterministic ORTHOGONAL rotation —
      // intra-replica cosines (and norms, so the exact-integer unit
      // scaling) are preserved to float precision (the rotation runs in
      // Double, components truncate back to Float — a borderline
      // micro-scaled component or LSH sign bit may flip, which perturbs
      // structure negligibly for a timing audit), while cross-replica
      // similarities collapse to random 64-dim cosines (N(0, 1/64) —
      // see the watched-list note for what that means at the fixture's
      // τ=0.5). Replica 0 is the identity, so the 1× replica
      // reproduces the real corpus verbatim (the doc_contamination
      // validation precedent).
      val emb = replicate(Tables.embeddings(spark, base), "vec_id",
        (df, i) => rotateEmbeddings(spark, df, i))
      emb.write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    }
    java.nio.file.Files.writeString(done, fingerprint)
    dir
  }

  /** deterministic 64×64 orthogonal matrix for replica `i`: a product of
    * 128 Givens rotations whose dim-pairs and angles derive from md5 —
    * no RNG, same matrix every run; replica 0 is the identity */
  private def rotationFor(i: Int, dim: Int): Array[Array[Double]] = {
    val m = Array.tabulate(dim, dim)((r, c) => if (r == c) 1.0 else 0.0)
    if (i == 0) return m
    val md = java.security.MessageDigest.getInstance("MD5")
    var k = 0
    while (k < dim * 2) {
      val h = md.digest(s"emb-rot:$i:$k".getBytes("UTF-8"))
      val a = (((h(0) & 0xff) << 8) | (h(1) & 0xff)) % dim
      val b0 = (((h(2) & 0xff) << 8) | (h(3) & 0xff)) % dim
      val b = if (b0 == a) (a + 1) % dim else b0
      val theta = ((((h(4) & 0xff) << 16) | ((h(5) & 0xff) << 8) |
        (h(6) & 0xff)).toDouble / (1 << 24)) * 2 * math.Pi
      val (c, s) = (math.cos(theta), math.sin(theta))
      var r = 0
      while (r < dim) {
        val xa = m(r)(a); val xb = m(r)(b)
        m(r)(a) = xa * c - xb * s
        m(r)(b) = xa * s + xb * c
        r += 1
      }
      k += 1
    }
    m
  }

  private def rotateEmbeddings(
      spark: SparkSession, df: DataFrame, i: Int): DataFrame =
    if (i == 0) df
    else {
      import spark.implicits._
      val bc = spark.sparkContext.broadcast(rotationFor(i, 64))
      df.select(col("vec_id"), col("embedding"), col("label"))
        .as[(Long, Array[Float], Int)]
        .map { case (id, v, l) =>
          val r = bc.value
          val d = v.length
          val out = new Array[Float](d)
          var c = 0
          while (c < d) {
            var s = 0.0; var j = 0
            while (j < d) { s += v(j) * r(j)(c); j += 1 }
            out(c) = s.toFloat; c += 1
          }
          (id, out, l)
        }
        .toDF("vec_id", "embedding", "label")
    }
}
