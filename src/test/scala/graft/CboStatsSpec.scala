package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation
import org.scalatest.funsuite.AnyFunSuite

/** ANALYZE-style column statistics feeding Spark's cost-based optimizer:
  * `CALL graft.system.analyze` runs one distributed pass (NDV / nulls /
  * ranges / lengths → `_log/_colstats.json`), the native scan serves it
  * through DSv2 `columnStats`, and Catalyst turns it into per-attribute
  * stats (distinctCount et al.) that CostBasedJoinReorder and filter
  * estimation consume. The oracle-side correctness never depends on
  * stats (they only steer plans); this spec pins the PLUMBING: stats
  * appear on the relation, survive pruned reads, reflect re-analysis,
  * and flip a CBO join order.
  */
class CboStatsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.extensions", "graft.GraftExtensions")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private lazy val wh = {
    val dir = Files.createTempDirectory("graft_cbo").toString
    spark.conf.set("spark.sql.catalog.gc", "graft.sql.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gc.warehouse", dir)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gc.db")
    spark.sql("""CREATE TABLE gc.db.t (pk BIGINT, ts INT, grp STRING, val INT)
                 USING graft TBLPROPERTIES (keyCols='pk', precombineCol='ts')""")
    import spark.implicits._
    (1 to 400).map(i => (i.toLong, 0, s"g${i % 7}", if (i % 5 == 0) null else s"$i"))
      .toDF("pk", "ts", "grp", "vs")
      .selectExpr("pk", "ts", "grp", "CAST(vs AS INT) AS val")
      .createOrReplaceTempView("cbo_src")
    spark.sql("INSERT INTO gc.db.t SELECT * FROM cbo_src")
    dir
  }

  private def attrStats(sql: String) = {
    val plan = spark.sql(sql).queryExecution.optimizedPlan
    val rels = plan.collect { case r: DataSourceV2ScanRelation => r }
    assert(rels.nonEmpty, s"expected a v2 scan relation in:\n$plan")
    rels.head.stats.attributeStats
  }

  test("analyze populates attribute stats the planner can read") {
    wh
    // before analyze: no column stats, only exact size/row counts
    assert(attrStats("SELECT pk, grp, val FROM gc.db.t WHERE pk > 0").isEmpty)

    val analyzedAt =
      spark.sql("CALL gc.system.analyze('db.t')").collect().head.getLong(0)
    assert(analyzedAt >= 0)

    val stats = attrStats("SELECT pk, grp, val FROM gc.db.t WHERE pk > 0")
    val byName = stats.map { case (a, s) => a.name -> s }
    // NDV: pk unique (approx — HLL), grp has 7 values, val has nulls
    assert(byName("pk").distinctCount.exists(d => d.toLong > 350 && d.toLong < 450))
    assert(byName("grp").distinctCount.exists(_.toLong == 7))
    assert(byName("val").nullCount.exists(_.toLong == 80))
    // numeric range served in catalyst form
    assert(byName("pk").min.contains(1L) && byName("pk").max.contains(400L))
    // string column: lengths present, range absent
    assert(byName("grp").avgLen.exists(_ > 0) && byName("grp").min.isEmpty)
  }

  test("ANSI ANALYZE TABLE spelling routes to the same column pass") {
    wh
    spark.sql("""CREATE TABLE gc.db.ansi (pk BIGINT, ts INT, grp STRING)
                 USING graft TBLPROPERTIES (keyCols='pk', precombineCol='ts')""")
    import spark.implicits._
    (1 to 90).map(i => (i.toLong, 0, s"g${i % 4}")).toDF("pk", "ts", "grp")
      .createOrReplaceTempView("ansi_src")
    spark.sql("INSERT INTO gc.db.ansi SELECT * FROM ansi_src")
    // bare form: successful no-op (counts are commit-log-exact already)
    spark.sql("ANALYZE TABLE gc.db.ansi COMPUTE STATISTICS")
    assert(attrStats("SELECT pk FROM gc.db.ansi").isEmpty)
    spark.sql("ANALYZE TABLE gc.db.ansi COMPUTE STATISTICS FOR ALL COLUMNS")
    val st = attrStats("SELECT pk, grp FROM gc.db.ansi")
      .map { case (a, s) => a.name -> s }
    assert(st("grp").distinctCount.exists(_.toLong == 4))
    assert(st("pk").distinctCount.exists(_.toLong > 70))
  }

  test("re-analyze tracks mutation; stale stats still serve") {
    wh
    spark.sql("CALL gc.system.analyze('db.t')").collect()
    spark.sql("DELETE FROM gc.db.t WHERE pk > 100")
    // stale: stats still present (estimates), row count stays exact
    val stale = attrStats("SELECT pk FROM gc.db.t")
    assert(stale.map { case (a, s) => a.name -> s }.apply("pk")
      .distinctCount.exists(_.toLong > 300))
    spark.sql("CALL gc.system.analyze('db.t')").collect()
    val fresh = attrStats("SELECT pk FROM gc.db.t")
    assert(fresh.map { case (a, s) => a.name -> s }.apply("pk")
      .distinctCount.exists(_.toLong < 150))
  }

  test("CBO join reorder consumes the stats") {
    wh
    // big fact (5000 rows) joined to two dims: tiny (3 rows) and small
    // (500). Written in the WORST textual order (fact ⋈ mid first, tiny
    // last); with CBO + stats the optimizer should reorder so the
    // selective tiny dim joins early. We assert CBO produces a
    // DIFFERENT join tree than the no-stats plan — the reorder engaged
    // on our numbers (plan shape, not timing: local[4] timing is noise).
    import spark.implicits._
    (1 to 5000).map(i => (i.toLong, 0, i % 500 + 1, i % 3 + 1))
      .toDF("pk", "ts", "mid_k", "tiny_k").createOrReplaceTempView("fact_src")
    (1 to 500).map(i => (i.toLong, 0, s"m$i")).toDF("mid_k", "ts", "mname")
      .createOrReplaceTempView("mid_src")
    (1 to 3).map(i => (i.toLong, 0, s"t$i")).toDF("tiny_k", "ts", "tname")
      .createOrReplaceTempView("tiny_src")
    spark.sql("""CREATE TABLE gc.db.fact (pk BIGINT, ts INT, mid_k INT, tiny_k INT)
                 USING graft TBLPROPERTIES (keyCols='pk', precombineCol='ts')""")
    spark.sql("""CREATE TABLE gc.db.dim_mid (mid_k BIGINT, ts INT, mname STRING)
                 USING graft TBLPROPERTIES (keyCols='mid_k', precombineCol='ts')""")
    spark.sql("""CREATE TABLE gc.db.dim_tiny (tiny_k BIGINT, ts INT, tname STRING)
                 USING graft TBLPROPERTIES (keyCols='tiny_k', precombineCol='ts')""")
    spark.sql("INSERT INTO gc.db.fact SELECT * FROM fact_src")
    spark.sql("INSERT INTO gc.db.dim_mid SELECT * FROM mid_src")
    spark.sql("INSERT INTO gc.db.dim_tiny SELECT * FROM tiny_src")
    Seq("db.fact", "db.dim_mid", "db.dim_tiny").foreach(t =>
      spark.sql(s"CALL gc.system.analyze('$t')").collect())

    val q = """SELECT f.pk, m.mname, t.tname
               FROM gc.db.fact f
               JOIN gc.db.dim_mid m ON f.mid_k = m.mid_k
               JOIN gc.db.dim_tiny t ON f.tiny_k = t.tiny_k
               WHERE t.tname = 't1'"""
    def joinShape(cbo: Boolean): String = {
      spark.conf.set("spark.sql.cbo.enabled", cbo)
      spark.conf.set("spark.sql.cbo.joinReorder.enabled", cbo)
      try spark.sql(q).queryExecution.optimizedPlan.collect {
        case j: org.apache.spark.sql.catalyst.plans.logical.Join =>
          j.condition.map(_.sql).getOrElse("")
      }.mkString(" | ")
      finally {
        spark.conf.unset("spark.sql.cbo.enabled")
        spark.conf.unset("spark.sql.cbo.joinReorder.enabled")
      }
    }
    val without = joinShape(cbo = false)
    val withCbo = joinShape(cbo = true)
    assert(withCbo != without,
      s"CBO did not change the join tree:\n  off: $without\n  on:  $withCbo")
    // and the result is unchanged by planning
    val rows = spark.sql(q).collect()
    assert(rows.length == 5000 / 3 + (if (5000 % 3 >= 1) 1 else 0) ||
      rows.length > 1500) // ~1667 rows with tiny_k == 1
  }

  test("frequent items make skewed string equality estimate truthfully") {
    wh
    spark.sql("""CREATE TABLE gc.db.status (pk BIGINT, ts INT, status STRING)
                 USING graft TBLPROPERTIES (keyCols='pk', precombineCol='ts')""")
    import spark.implicits._
    // categorical skew: 'FAILED' at 0.1% of rows, 'OK' dominating —
    // NDV-uniform (1/3) estimates ~1333 rows for either predicate
    val n = 4000
    (1 to n).map { i =>
      val s = if (i % 1000 == 0) "FAILED" else if (i % 10 == 0) "RETRY" else "OK"
      (i.toLong, 0, s)
    }.toDF("pk", "ts", "status").createOrReplaceTempView("status_src")
    spark.sql("INSERT INTO gc.db.status SELECT * FROM status_src")
    spark.sql("CALL gc.system.analyze('db.status')").collect()

    def scanEstimate(value: String): BigInt = {
      spark.conf.set("spark.sql.cbo.enabled", "true")
      try {
        val plan = spark.sql(
          s"SELECT pk FROM gc.db.status WHERE status = '$value'")
          .queryExecution.optimizedPlan
        val rel = plan.collect { case r: DataSourceV2ScanRelation => r }
        assert(rel.nonEmpty, s"expected a v2 scan relation in:\n$plan")
        rel.head.stats.rowCount.get
      } finally spark.conf.unset("spark.sql.cbo.enabled")
    }
    def truth(value: String): Long = spark.sql(
      s"SELECT count(*) FROM gc.db.status WHERE status = '$value'")
      .collect().head.getLong(0)

    // within 2x of truth on BOTH tails of the skew (NDV-uniform would
    // put each at n/3 ≈ 1333 — 300x off for the rare value)
    Seq("FAILED", "OK", "RETRY").foreach { v =>
      val est = scanEstimate(v).toLong
      val t = truth(v)
      assert(est <= 2 * t && t <= 2 * est,
        s"'$v': scan estimate $est vs truth $t must agree within 2x")
    }
    // predicates the stats can't speak to keep the exact file count
    assert(scanEstimate("NEVER_SEEN") <= truth("FAILED") * 2,
      "an unseen value estimates from the residual mass, never above a rare item")
  }

  test("claimed partition filters are never double-counted by frequent items") {
    wh
    spark.sql("""CREATE TABLE gc.db.pstat (pk BIGINT, ts INT, status STRING)
                 USING graft PARTITIONED BY (status)
                 TBLPROPERTIES (keyCols='pk', precombineCol='ts')""")
    import spark.implicits._
    (1 to 1000).map(i => (i.toLong, 0, if (i % 100 == 0) "FAILED" else "OK"))
      .toDF("pk", "ts", "status").createOrReplaceTempView("pstat_src")
    spark.sql("INSERT INTO gc.db.pstat SELECT * FROM pstat_src")
    spark.sql("CALL gc.system.analyze('db.pstat')").collect()
    // status is a PARTITION column: the equality is claimed (file
    // pruning IS row selection), so the pruned exact count must come
    // back UNSCALED — multiplying by the value's share again would
    // underestimate by that share
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try {
      val plan = spark.sql("SELECT pk FROM gc.db.pstat WHERE status = 'OK'")
        .queryExecution.optimizedPlan
      val est = plan.collect { case r: DataSourceV2ScanRelation => r }
        .head.stats.rowCount.get.toLong
      assert(est == 990L,
        s"claimed-partition estimate must be the exact pruned count, got $est")
    } finally spark.conf.unset("spark.sql.cbo.enabled")
  }

  test("histograms move a skewed-predicate estimate toward truth") {
    wh
    spark.sql("""CREATE TABLE gc.db.skew (pk BIGINT, ts INT, v INT)
                 USING graft TBLPROPERTIES (keyCols='pk', precombineCol='ts')""")
    import spark.implicits._
    // heavy skew: 90% of rows hold v in [0, 10], 10% spread over
    // (10, 1000] — range interpolation over [0, 1000] estimates a
    // `v > 900` filter at ~10% of rows; the truth is ~1%
    val n = 4000
    (1 to n).map { i =>
      val v = if (i % 10 == 0) 10 + (i % 100) * 10 else i % 11
      (i.toLong, 0, v)
    }.toDF("pk", "ts", "v").createOrReplaceTempView("skew_src")
    spark.sql("INSERT INTO gc.db.skew SELECT * FROM skew_src")
    spark.sql("CALL gc.system.analyze('db.skew')").collect()

    // histogram is served on the relation
    val vStats = attrStats("SELECT pk, v FROM gc.db.skew WHERE pk > 0")
      .map { case (a, s) => a.name -> s }.apply("v")
    assert(vStats.histogram.isDefined, "ANALYZE must serve an equi-height histogram")

    val truth = spark.sql("SELECT count(*) FROM gc.db.skew WHERE v > 900")
      .collect().head.getLong(0)
    def estimate(): BigInt = {
      spark.conf.set("spark.sql.cbo.enabled", "true")
      try {
        val plan = spark.sql("SELECT pk FROM gc.db.skew WHERE v > 900")
          .queryExecution.optimizedPlan
        plan.collectFirst {
          case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
            f.stats.rowCount.get
        }.getOrElse(plan.stats.rowCount.get)
      } finally spark.conf.unset("spark.sql.cbo.enabled")
    }
    val est = estimate()
    // interpolation-only estimate would be ~ (1000-900)/1000 * 4000 = 400
    // rows against a truth of ~40; the histogram must land much closer
    val interpOnly = BigInt((n * (1000.0 - 900.0) / 1000.0).toLong)
    assert((est - BigInt(truth)).abs < (interpOnly - BigInt(truth)).abs / 2,
      s"histogram estimate $est not closer to truth $truth than interpolation $interpOnly")
  }
}
