package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join, Project}
import org.scalatest.funsuite.AnyFunSuite

/** Plan-time skew-join mitigation ([[graft.sql.GraftSkewJoinRule]]):
  * the ANALYZE frequent-items stats prove a join key's hot value at
  * plan time, and the join re-shapes BEFORE any shuffle exists —
  * broadcast override when the other side fits the raised budget,
  * hot-key salting otherwise. Values are pinned by the rule-off runs
  * in each test (and by every existing oracle — the rule fires on all
  * catalog queries); this spec pins the PLAN changes.
  */
class SkewJoinSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.extensions", "graft.GraftExtensions")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private lazy val wh = {
    val dir = Files.createTempDirectory("graft_skew").toString
    spark.conf.set("spark.sql.catalog.gs", "graft.sql.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gs.warehouse", dir)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gs.db")
    import spark.implicits._
    // fact: 6000 rows, 'HOT' owns half the join key — a 1500:1 skew
    // against the ~3000 other distinct values
    spark.sql("""CREATE TABLE gs.db.sfact (pk BIGINT, ts INT, k STRING, v INT)
                 USING graft TBLPROPERTIES (keyCols='pk', precombineCol='ts')""")
    (1 to 6000).map(i =>
        (i.toLong, 0, if (i % 2 == 0) "HOT" else s"k$i", i % 100))
      .toDF("pk", "ts", "k", "v").createOrReplaceTempView("sfact_src")
    spark.sql("INSERT INTO gs.db.sfact SELECT * FROM sfact_src")
    // dim: 2000 rows incl. the hot key
    spark.sql("""CREATE TABLE gs.db.sdim (k STRING, ts INT, name STRING)
                 USING graft TBLPROPERTIES (keyCols='k', precombineCol='ts')""")
    (("HOT", 0, "hot-name") +: (1 to 1999).map(i => (s"k$i", 0, s"n$i")))
      .toDF("k", "ts", "name").createOrReplaceTempView("sdim_src")
    spark.sql("INSERT INTO gs.db.sdim SELECT * FROM sdim_src")
    spark.sql("CALL gs.system.analyze('db.sfact')").collect()
    spark.conf.set("spark.graft.skewJoin.minRows", "100")
    dir
  }

  private val q =
    """SELECT f.pk, f.v, d.name FROM gs.db.sfact f
       JOIN gs.db.sdim d ON f.k = d.k"""

  private def withConfs(kvs: (String, String)*)(body: => Unit): Unit = {
    kvs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally kvs.foreach { case (k, _) => spark.conf.unset(k) }
  }

  test("skewed join force-broadcasts the small side past the auto threshold") {
    wh
    // dim is ABOVE the (deliberately tiny) auto threshold, inside the
    // skew budget: the stats-proven hot key justifies the raise
    withConfs("spark.sql.autoBroadcastJoinThreshold" -> "1024") {
      val joins = spark.sql(q).queryExecution.optimizedPlan
        .collect { case j: Join => j }
      assert(joins.nonEmpty)
      assert(joins.exists(j => j.hint.leftHint.exists(_.strategy.isDefined) ||
        j.hint.rightHint.exists(_.strategy.isDefined)),
        s"expected a BROADCAST hint on the skewed join:\n${joins.mkString("\n")}")
      assert(spark.sql(q).queryExecution.executedPlan.toString
        .contains("BroadcastHashJoin"))
    }
    // rule off: no hint appears
    withConfs("spark.sql.autoBroadcastJoinThreshold" -> "1024",
        "spark.graft.skewJoin.enabled" -> "false") {
      val joins = spark.sql(q).queryExecution.optimizedPlan
        .collect { case j: Join => j }
      assert(joins.forall(j => j.hint.leftHint.forall(_.strategy.isEmpty) &&
        j.hint.rightHint.forall(_.strategy.isEmpty)))
    }
  }

  test("salting engages when neither side is broadcastable, values pinned") {
    wh
    val expected = withSalt(off = true)
    val got = withSalt(off = false)
    assert(got.length == expected.length && got.sameElements(expected),
      "salted join must return exactly the unsalted rows")
  }

  private def withSalt(off: Boolean): Array[String] = {
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.graft.skewJoin.broadcastMax" -> "1") ++
      (if (off) Seq("spark.graft.skewJoin.enabled" -> "false") else Nil)
    var out: Array[String] = null
    withConfs(confs: _*) {
      val df = spark.sql(q)
      val plan = df.queryExecution.optimizedPlan
      val salted = plan.collect {
        case g: Generate => g
      }.nonEmpty && plan.collect {
        case p: Project if p.projectList.exists(
          _.name.startsWith(graft.sql.GraftSkewJoinRule.SaltCol)) => p
      }.nonEmpty
      if (off) assert(!salted, s"rule disabled but plan salted:\n$plan")
      else {
        assert(salted, s"expected a salted re-shape in:\n$plan")
        // the salt is internal: output schema is untouched
        assert(df.schema.fieldNames.toSeq == Seq("pk", "v", "name"))
        // and the join now keys on (k, salt): the condition mentions it
        val conds = plan.collect { case j: Join => j.condition.map(_.sql).getOrElse("") }
        assert(conds.exists(_.contains(graft.sql.GraftSkewJoinRule.SaltCol)),
          s"join condition must carry the salt key:\n${conds.mkString("\n")}")
      }
      out = df.collect().map(r => s"${r.getLong(0)}|${r.getInt(1)}|${r.getString(2)}")
        .sorted
    }
    out
  }

  test("left outer join salts only around a skewed stream side, null keys survive") {
    wh
    import spark.implicits._
    // fact with NULL keys (preserved by LEFT OUTER, untouched by salt)
    spark.sql("""CREATE TABLE gs.db.nfact (pk BIGINT, ts INT, k STRING)
                 USING graft TBLPROPERTIES (keyCols='pk', precombineCol='ts')""")
    (1 to 4000).map(i => (i.toLong, 0,
        if (i % 7 == 0) null else if (i % 2 == 0) "HOT" else s"k$i"))
      .toDF("pk", "ts", "k").createOrReplaceTempView("nfact_src")
    spark.sql("INSERT INTO gs.db.nfact SELECT * FROM nfact_src")
    spark.sql("CALL gs.system.analyze('db.nfact')").collect()
    val lq = """SELECT f.pk, d.name FROM gs.db.nfact f
                LEFT JOIN gs.db.sdim d ON f.k = d.k"""
    def run(off: Boolean): Array[String] = {
      val confs = Seq(
        "spark.sql.autoBroadcastJoinThreshold" -> "-1",
        "spark.graft.skewJoin.broadcastMax" -> "1") ++
        (if (off) Seq("spark.graft.skewJoin.enabled" -> "false") else Nil)
      var out: Array[String] = null
      withConfs(confs: _*) {
        val df = spark.sql(lq)
        if (!off) assert(df.queryExecution.optimizedPlan.collect {
          case g: Generate => g }.nonEmpty, "expected the left-outer salt")
        out = df.collect().map(r => s"${r.getLong(0)}|${r.getString(1)}").sorted
      }
      out
    }
    val expected = run(off = true)
    val got = run(off = false)
    assert(got.length == 4000, "left side must be fully preserved")
    assert(got.sameElements(expected))
  }

  test("numeric hot key: the histogram's degenerate bins drive the salt") {
    wh
    import spark.implicits._
    // classic sentinel-id skew: customer 0 owns half the fact
    spark.sql("""CREATE TABLE gs.db.ifact (pk BIGINT, ts INT, cust BIGINT, v INT)
                 USING graft TBLPROPERTIES (keyCols='pk', precombineCol='ts')""")
    (1 to 6000).map(i =>
        (i.toLong, 0, if (i % 2 == 0) 0L else (i % 2000).toLong, i % 100))
      .toDF("pk", "ts", "cust", "v").createOrReplaceTempView("ifact_src")
    spark.sql("INSERT INTO gs.db.ifact SELECT * FROM ifact_src")
    spark.sql("""CREATE TABLE gs.db.idim (cust BIGINT, ts INT, name STRING)
                 USING graft TBLPROPERTIES (keyCols='cust', precombineCol='ts')""")
    (0 to 1999).map(i => (i.toLong, 0, s"c$i")).toDF("cust", "ts", "name")
      .createOrReplaceTempView("idim_src")
    spark.sql("INSERT INTO gs.db.idim SELECT * FROM idim_src")
    spark.sql("CALL gs.system.analyze('db.ifact')").collect()
    val iq = """SELECT f.pk, d.name FROM gs.db.ifact f
                JOIN gs.db.idim d ON f.cust = d.cust"""
    def run(off: Boolean): Array[String] = {
      val confs = Seq(
        "spark.sql.autoBroadcastJoinThreshold" -> "-1",
        "spark.graft.skewJoin.broadcastMax" -> "1") ++
        (if (off) Seq("spark.graft.skewJoin.enabled" -> "false") else Nil)
      var out: Array[String] = null
      withConfs(confs: _*) {
        val df = spark.sql(iq)
        val salted = df.queryExecution.optimizedPlan.collect {
          case g: Generate => g }.nonEmpty
        assert(salted == !off,
          s"numeric-skew salting expected=${!off}:\n${df.queryExecution.optimizedPlan}")
        out = df.collect().map(r => s"${r.getLong(0)}|${r.getString(1)}").sorted
      }
      out
    }
    val expected = run(off = true)
    val got = run(off = false)
    assert(got.length == 6000 && got.sameElements(expected))
  }

  test("no stats / no skew: the join is untouched") {
    wh
    // sdim was never analyzed — a join keyed on ITS skew evidence only
    // (swap sides so the analyzed fact isn't the probe) stays untouched
    val uq = """SELECT d.name, f2.name FROM gs.db.sdim d
                JOIN gs.db.sdim f2 ON d.k = f2.k"""
    withConfs("spark.sql.autoBroadcastJoinThreshold" -> "-1",
        "spark.graft.skewJoin.broadcastMax" -> "1") {
      val plan = spark.sql(uq).queryExecution.optimizedPlan
      assert(plan.collect { case g: Generate => g }.isEmpty)
      assert(plan.collect { case j: Join => j }.forall(j =>
        j.hint.leftHint.forall(_.strategy.isEmpty) &&
          j.hint.rightHint.forall(_.strategy.isEmpty)))
    }
  }
}
