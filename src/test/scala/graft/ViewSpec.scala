package graft

import java.nio.file.Files

import org.apache.spark.sql.{AnalysisException, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** SQL views and materialized views on the graft catalog, end-to-end
  * through `spark.sql`: CREATE/DROP/ALTER/SHOW VIEW (parser-hook DDL —
  * Spark 4.1 has no native v2-view path), read-time substitution with
  * definer-context qualification, nested views, cycle rejection,
  * CREATE MATERIALIZED VIEW → incrementally-maintained LakeTable,
  * CALL refresh_mv, and the transparent aggregate rewrite with its
  * freshness guard.
  */
class ViewSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.extensions", "graft.GraftExtensions")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private lazy val wh = {
    val dir = Files.createTempDirectory("graft_vwh").toString
    spark.conf.set("spark.sql.catalog.gv", "graft.sql.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gv.warehouse", dir)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gv.db")
    spark.sql("""CREATE TABLE gv.db.base (pk BIGINT, ts INT, qty INT, region STRING)
                 USING graft TBLPROPERTIES (keyCols='pk', precombineCol='ts')""")
    spark.sql("""INSERT INTO gv.db.base VALUES
      (1, 0, 10, 'r1'), (2, 0, 20, 'r1'), (3, 0, 5, 'r2'), (4, 0, 40, 'r3')""")
    dir
  }

  private def rows(sql: String): Seq[Seq[Any]] =
    spark.sql(sql).collect().toSeq.map(_.toSeq)

  test("CREATE VIEW / read / nested view / SHOW / ALTER / DROP") {
    wh
    spark.sql("""CREATE VIEW gv.db.v1 (key, amount)
                 AS SELECT pk, qty FROM gv.db.base WHERE region <> 'r3'""")
    assert(rows("SELECT key, amount FROM gv.db.v1 ORDER BY key") ==
      Seq(Seq(1L, 10), Seq(2L, 20), Seq(3L, 5)))

    // nested: a view over a view, with an expression output
    spark.sql("""CREATE VIEW gv.db.v2
                 AS SELECT key, amount * 2 AS dbl FROM gv.db.v1 WHERE key <= 2""")
    assert(rows("SELECT * FROM gv.db.v2 ORDER BY key") ==
      Seq(Seq(1L, 20), Seq(2L, 40)))

    // views are LIVE over the base table (text re-analyzed per read)
    spark.sql("INSERT INTO gv.db.base VALUES (2, 5, 21, 'r1')")
    assert(rows("SELECT * FROM gv.db.v2 ORDER BY key") ==
      Seq(Seq(1L, 20), Seq(2L, 42)))

    val shown = rows("SHOW VIEWS IN gv.db").map(_(1))
    assert(shown.contains("v1") && shown.contains("v2"))
    assert(rows("SHOW VIEWS IN gv.db LIKE 'v1'") == Seq(Seq("db", "v1", false)))

    // CREATE without REPLACE on an existing view refuses; OR REPLACE wins
    intercept[AnalysisException] {
      spark.sql("CREATE VIEW gv.db.v1 AS SELECT 1 AS x")
    }
    spark.sql("CREATE OR REPLACE VIEW gv.db.v1 AS SELECT pk AS key, qty AS amount FROM gv.db.base")
    assert(rows("SELECT count(*) FROM gv.db.v1") == Seq(Seq(4L)))
    // v2 reads THROUGH the replaced v1 definition
    assert(rows("SELECT * FROM gv.db.v2 ORDER BY key") ==
      Seq(Seq(1L, 20), Seq(2L, 42)))

    spark.sql("ALTER VIEW gv.db.v2 AS SELECT key FROM gv.db.v1 WHERE amount >= 20")
    assert(rows("SELECT * FROM gv.db.v2 ORDER BY key") == Seq(Seq(2L), Seq(4L)))

    spark.sql("DROP VIEW gv.db.v2")
    intercept[AnalysisException] { spark.sql("SELECT * FROM gv.db.v2") }
    spark.sql("DROP VIEW IF EXISTS gv.db.v2") // idempotent with IF EXISTS
    intercept[AnalysisException] { spark.sql("DROP VIEW gv.db.v2") }
  }

  test("DESCRIBE / SHOW CREATE / RENAME on views") {
    wh
    spark.sql("""CREATE VIEW gv.db.meta_v (key, amount)
                 AS SELECT pk, qty FROM gv.db.base""")
    val desc = rows("DESCRIBE gv.db.meta_v")
    assert(desc.map(r => (r(0), r(1))).toSet ==
      Set(("key", "bigint"), ("amount", "int")))
    val ext = rows("DESCRIBE EXTENDED gv.db.meta_v").map(_(0))
    assert(ext.contains("View Text") && ext.contains("# Detailed View Information"))
    val created = rows("SHOW CREATE TABLE gv.db.meta_v").head.head.toString
    assert(created.startsWith("CREATE VIEW gv.db.meta_v (key, amount) AS "))

    spark.sql("ALTER VIEW gv.db.meta_v RENAME TO meta_v2")
    assert(rows("SELECT count(*) FROM gv.db.meta_v2").head.head.asInstanceOf[Long] > 0)
    intercept[AnalysisException] { spark.sql("SELECT * FROM gv.db.meta_v") }
    // renaming onto an existing table name refuses
    spark.sql("CREATE VIEW gv.db.meta_v3 AS SELECT 1 AS one")
    intercept[AnalysisException] {
      spark.sql("ALTER VIEW gv.db.meta_v3 RENAME TO base")
    }
    // DESCRIBE on a real TABLE still takes Spark's native path
    assert(rows("DESCRIBE gv.db.base").nonEmpty)
  }

  test("TRUNCATE TABLE empties in one commit; time travel still reaches history") {
    wh
    spark.sql("""CREATE TABLE gv.db.trunc (pk BIGINT, ts INT, v STRING)
                 USING graft TBLPROPERTIES (keyCols='pk', precombineCol='ts')""")
    spark.sql("INSERT INTO gv.db.trunc VALUES (1, 0, 'a'), (2, 0, 'b')")
    spark.sql("TRUNCATE TABLE gv.db.trunc")
    assert(rows("SELECT count(*) FROM gv.db.trunc") == Seq(Seq(0L)))
    assert(rows("SELECT count(*) FROM gv.db.trunc VERSION AS OF 0") == Seq(Seq(2L)))
    // the table stays writable after truncate
    spark.sql("INSERT INTO gv.db.trunc VALUES (3, 0, 'c')")
    assert(rows("SELECT v FROM gv.db.trunc") == Seq(Seq("c")))
  }

  test("DROP TABLE of a materialized view deregisters it from its source") {
    wh
    spark.sql("""CREATE TABLE gv.db.src_dereg (pk BIGINT, ts INT, region STRING)
                 USING graft TBLPROPERTIES (keyCols='pk', precombineCol='ts')""")
    spark.sql("INSERT INTO gv.db.src_dereg VALUES (1, 0, 'r1')")
    spark.sql("""CREATE MATERIALIZED VIEW gv.db.mv_dereg AS
      SELECT region, count(*) AS n FROM gv.db.src_dereg GROUP BY region""")
    val srcRoot = wh + "/db/src_dereg"
    val hconf = spark.sparkContext.hadoopConfiguration
    def registered: Seq[String] =
      graft.lake.TableDescriptor.load(srcRoot, hconf)
        .map(d => Option(d.matViews).getOrElse(Seq.empty)).getOrElse(Seq.empty)
    assert(registered.exists(_.endsWith("mv_dereg")))
    spark.sql("DROP TABLE gv.db.mv_dereg")
    assert(!registered.exists(_.endsWith("mv_dereg")),
      "dropping the MV must deregister it from the source descriptor")
  }

  test("ANSI constraints: CHECK enforced, PRIMARY KEY declares the record key") {
    wh
    spark.sql("""CREATE TABLE gv.db.cons (pk BIGINT, ts INT, qty INT,
        CONSTRAINT pk_is_key PRIMARY KEY (pk),
        CONSTRAINT qty_pos CHECK (qty > 0))
      USING graft TBLPROPERTIES (precombineCol='ts')""")
    // PRIMARY KEY defined keyCols: an upsert on the same pk collapses
    spark.sql("INSERT INTO gv.db.cons VALUES (1, 0, 5)")
    spark.sql("INSERT INTO gv.db.cons VALUES (1, 1, 9)")
    assert(rows("SELECT qty FROM gv.db.cons WHERE pk = 1") == Seq(Seq(9)))
    // CHECK is ENFORCED per write
    val e = intercept[Exception] {
      spark.sql("INSERT INTO gv.db.cons VALUES (2, 0, -3)")
    }
    assert(e.getMessage.contains("qty_pos") ||
      Option(e.getCause).exists(_.getMessage.contains("qty_pos")),
      s"violating row must name the constraint: ${e.getMessage.take(300)}")
    // unenforceable constraint kinds refuse loudly
    intercept[Exception] {
      spark.sql("""CREATE TABLE gv.db.cons_bad (a BIGINT, ts INT,
          CONSTRAINT u UNIQUE (a))
        USING graft TBLPROPERTIES (keyCols='a', precombineCol='ts')""")
    }

    // ALTER TABLE ADD CONSTRAINT validates existing rows (Spark's exec
    // runs the NOT(pred) scan) then enforces going forward; DROP lifts it
    intercept[Exception] {
      spark.sql("ALTER TABLE gv.db.cons ADD CONSTRAINT qty_small CHECK (qty < 9)")
    } // existing row qty=9 violates
    spark.sql("ALTER TABLE gv.db.cons ADD CONSTRAINT qty_small CHECK (qty < 100)")
    intercept[Exception] {
      spark.sql("INSERT INTO gv.db.cons VALUES (3, 0, 500)")
    }
    spark.sql("ALTER TABLE gv.db.cons DROP CONSTRAINT qty_small")
    spark.sql("INSERT INTO gv.db.cons VALUES (3, 0, 500)")
    assert(rows("SELECT qty FROM gv.db.cons WHERE pk = 3") == Seq(Seq(500)))
  }

  test("columns feeding MVs and generated columns are pinned against rename/drop") {
    wh
    spark.sql("""CREATE TABLE gv.db.pin_src (pk BIGINT, ts INT, region STRING,
        qty INT, q2 INT GENERATED ALWAYS AS (qty + 1))
      USING graft TBLPROPERTIES (keyCols='pk', precombineCol='ts')""")
    spark.sql("INSERT INTO gv.db.pin_src (pk, ts, region, qty) VALUES (1, 0, 'r1', 5)")
    spark.sql("""CREATE MATERIALIZED VIEW gv.db.pin_mv AS
      SELECT region, count(*) AS n, sum(CAST(qty AS BIGINT)) AS total
      FROM gv.db.pin_src GROUP BY region""")
    // qty feeds both the generated column and the MV sum; region is an
    // MV dimension — renaming either must refuse
    intercept[Exception] {
      spark.sql("ALTER TABLE gv.db.pin_src RENAME COLUMN qty TO amount")
    }
    intercept[Exception] {
      spark.sql("ALTER TABLE gv.db.pin_src RENAME COLUMN region TO zone")
    }
    intercept[Exception] {
      spark.sql("ALTER TABLE gv.db.pin_src DROP COLUMN q2")
    }
    // dropping the MV unpins its columns (the generated col still pins qty)
    spark.sql("DROP TABLE gv.db.pin_mv")
    intercept[Exception] {
      spark.sql("ALTER TABLE gv.db.pin_src RENAME COLUMN qty TO amount")
    }
    spark.sql("ALTER TABLE gv.db.pin_src RENAME COLUMN region TO zone")
    assert(spark.sql("SELECT zone FROM gv.db.pin_src").collect().head.getString(0) == "r1")
  }

  test("view bodies resolve in the definer's context; cycles rejected") {
    wh
    // definer context: create from a session whose current catalog/ns is
    // gv.db, with a BARE table name in the body
    spark.sql("USE gv.db")
    try {
      spark.sql("CREATE VIEW ctx_v AS SELECT pk FROM base WHERE qty > 15")
      assert(rows("SELECT * FROM ctx_v ORDER BY pk").nonEmpty)
    } finally spark.sql("USE spark_catalog.default")
    // the stored definition still reads correctly under a DIFFERENT
    // current catalog (frozen definer context)
    assert(rows("SELECT * FROM gv.db.ctx_v ORDER BY pk").map(_.head) ==
      Seq(2L, 4L))

    // direct self-reference at CREATE OR REPLACE
    spark.sql("CREATE VIEW gv.db.selfy AS SELECT pk FROM gv.db.base")
    intercept[AnalysisException] {
      spark.sql("CREATE OR REPLACE VIEW gv.db.selfy AS SELECT * FROM gv.db.selfy")
    }
    // indirect cycle caught at read time
    spark.sql("CREATE VIEW gv.db.cyc_a AS SELECT pk FROM gv.db.base")
    spark.sql("CREATE VIEW gv.db.cyc_b AS SELECT * FROM gv.db.cyc_a")
    spark.sql("CREATE OR REPLACE VIEW gv.db.cyc_a AS SELECT * FROM gv.db.cyc_b")
    val e = intercept[AnalysisException] { spark.sql("SELECT * FROM gv.db.cyc_a") }
    assert(e.getCondition == "RECURSIVE_VIEW")
  }

  test("view DDL addressed to another catalog passes through untouched") {
    wh
    // with the CURRENT catalog set to graft, a multipart name whose head
    // names a registered non-graft catalog must reach Spark's own
    // machinery — not be swallowed as a namespace inside the graft
    // warehouse (the statement would otherwise silently land in the
    // wrong catalog and reads/drops against the real one would miss)
    spark.sql("SET CATALOG gv")
    try {
      spark.sql("CREATE VIEW spark_catalog.default.xv AS SELECT 1 AS one")
      assert(spark.sql("SELECT one FROM spark_catalog.default.xv")
        .collect().head.getInt(0) == 1)
      assert(spark.sql("SHOW VIEWS IN spark_catalog.default")
        .collect().exists(_.getString(1) == "xv"),
        "the view must live in the session catalog, not the graft warehouse")
      assert(!spark.sql("SHOW VIEWS IN gv.db")
        .collect().exists(_.getString(1) == "xv"))
      spark.sql("DROP VIEW spark_catalog.default.xv")
      assert(!spark.sql("SHOW VIEWS IN spark_catalog.default")
        .collect().exists(_.getString(1) == "xv"))
    } finally spark.sql("SET CATALOG spark_catalog")
  }

  test("a view cannot shadow a table; tables win at read time") {
    wh
    intercept[AnalysisException] {
      spark.sql("CREATE VIEW gv.db.base AS SELECT 1 AS x")
    }
  }

  test("CREATE MATERIALIZED VIEW + refresh_mv + direct read") {
    wh
    spark.sql("""CREATE MATERIALIZED VIEW gv.db.mv1 AS
      SELECT region, count(*) AS n, sum(CAST(qty AS BIGINT)) AS total,
             min(qty) AS lo, max(qty) AS hi
      FROM gv.db.base GROUP BY region""")
    // the MV is a real catalog table
    val direct = rows("SELECT region, n, total, lo, hi FROM gv.db.mv1 ORDER BY region")
    val expect = rows(
      """SELECT region, count(*) AS n, sum(CAST(qty AS BIGINT)) AS total,
             min(qty) AS lo, max(qty) AS hi
         FROM gv.db.base GROUP BY region ORDER BY region""")
    assert(direct == expect)

    // source moves; MV is stale until refreshed
    spark.sql("INSERT INTO gv.db.base VALUES (5, 0, 7, 'r2'), (1, 9, 11, 'r1')")
    val refreshed = rows("CALL gv.system.refresh_mv('db.mv1')").head.head
    assert(refreshed.asInstanceOf[Long] >= 0)
    val after = rows("SELECT region, n, total, lo, hi FROM gv.db.mv1 ORDER BY region")
    val expectAfter = rows(
      """SELECT region, count(*) AS n, sum(CAST(qty AS BIGINT)) AS total,
             min(qty) AS lo, max(qty) AS hi
         FROM gv.db.base GROUP BY region ORDER BY region""")
    assert(after == expectAfter)

    // float sums refuse with guidance
    val err = intercept[UnsupportedOperationException] {
      spark.sql("""CREATE MATERIALIZED VIEW gv.db.mv_bad AS
        SELECT region, sum(CAST(qty AS DOUBLE)) AS s FROM gv.db.base GROUP BY region""")
    }
    assert(err.getMessage.contains("scale and cast"))
  }

  test("transparent rewrite: fresh MV answers the aggregate, stale falls back") {
    wh
    spark.sql("""CREATE TABLE gv.db.fact (pk BIGINT, ts INT, qty INT, region STRING)
                 USING graft TBLPROPERTIES (keyCols='pk', precombineCol='ts')""")
    spark.sql("""INSERT INTO gv.db.fact VALUES
      (1, 0, 10, 'r1'), (2, 0, 20, 'r1'), (3, 0, 5, 'r2')""")
    spark.sql("""CREATE MATERIALIZED VIEW gv.db.fact_mv AS
      SELECT region, count(*) AS n, sum(CAST(qty AS BIGINT)) AS total
      FROM gv.db.fact GROUP BY region""")

    val q = """SELECT region, count(*) AS n, sum(CAST(qty AS BIGINT)) AS total
               FROM gv.db.fact GROUP BY region"""
    // the MV read lands as a V1 parquet relation whose toString hides
    // the path — identify the scanned table by the file-index roots
    def readsMv(sql: String): Boolean =
      spark.sql(sql).queryExecution.optimizedPlan.collect {
        case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          l.relation match {
            case h: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
              h.location.rootPaths.map(_.toString)
            case _ => Seq.empty[String]
          }
      }.flatten.exists(_.contains("fact_mv"))
    def planOf(sql: String): String =
      if (readsMv(sql)) "fact_mv" else ""

    // fresh → the optimized plan reads the MV table, not the fact table
    assert(planOf(q).contains("fact_mv"))
    assert(rows(q + " ORDER BY region") ==
      Seq(Seq("r1", 2L, 30L), Seq("r2", 1L, 5L)))

    // roll-up to a coarser grouping + dim filter also rewrite
    val roll = """SELECT count(*) AS n FROM gv.db.fact WHERE region = 'r1' GROUP BY region"""
    assert(planOf(roll).contains("fact_mv"))
    assert(rows(roll) == Seq(Seq(2L)))

    // stale MV → falls back to the base scan, result stays correct
    spark.sql("INSERT INTO gv.db.fact VALUES (4, 0, 40, 'r3')")
    assert(!planOf(q).contains("fact_mv"))
    assert(rows(q + " ORDER BY region") ==
      Seq(Seq("r1", 2L, 30L), Seq("r2", 1L, 5L), Seq("r3", 1L, 40L)))

    // refresh → rewrite resumes
    rows("CALL gv.system.refresh_mv('db.fact_mv')")
    assert(planOf(q).contains("fact_mv"))
    assert(rows(q + " ORDER BY region") ==
      Seq(Seq("r1", 2L, 30L), Seq("r2", 1L, 5L), Seq("r3", 1L, 40L)))

    // avg decomposes onto the MV (Σ sum / Σ non-null count) and matches
    // the direct aggregate exactly — including through the integer
    // widening cast the MV declaration requires
    val avg = "SELECT region, avg(qty) AS a FROM gv.db.fact GROUP BY region"
    assert(planOf(avg).contains("fact_mv"))
    assert(rows(avg + " ORDER BY region") ==
      rows("SELECT region, avg(qty) AS a FROM gv.db.fact.ro GROUP BY region ORDER BY region"))

    // a nondeterministic dim-only predicate must NOT transplant onto
    // the MV (it would fire once per group instead of once per row)
    val nondet = """SELECT region, count(*) AS n FROM gv.db.fact
                    WHERE length(region) > rand() * 0.0 GROUP BY region"""
    assert(!planOf(nondet).contains("fact_mv"))

    // kill switch
    spark.conf.set("spark.graft.mvRewrite", "false")
    try assert(!planOf(q).contains("fact_mv"))
    finally spark.conf.unset("spark.graft.mvRewrite")
  }

  test("bounded staleness: maxStaleness MV serves within tolerance, falls back beyond") {
    wh
    spark.sql("""CREATE TABLE gv.db.sfact (pk BIGINT, ts INT, qty INT, region STRING)
                 USING graft TBLPROPERTIES (keyCols='pk', precombineCol='ts')""")
    spark.sql("""INSERT INTO gv.db.sfact VALUES
      (1, 0, 10, 'r1'), (2, 0, 20, 'r1'), (3, 0, 5, 'r2')""")
    spark.sql("""CREATE MATERIALIZED VIEW gv.db.sfact_mv
      TBLPROPERTIES (maxStaleness='2') AS
      SELECT region, count(*) AS n, sum(CAST(qty AS BIGINT)) AS total
      FROM gv.db.sfact GROUP BY region""")
    val q = """SELECT region, count(*) AS n, sum(CAST(qty AS BIGINT)) AS total
               FROM gv.db.sfact GROUP BY region"""
    def readsMv: Boolean =
      spark.sql(q).queryExecution.optimizedPlan.collect {
        case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          l.relation match {
            case h: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
              h.location.rootPaths.map(_.toString)
            case _ => Seq.empty[String]
          }
      }.flatten.exists(_.contains("sfact_mv"))
    val c0 = Seq(Seq("r1", 2L, 30L), Seq("r2", 1L, 5L))
    assert(readsMv, "exactly fresh serves")

    // 1 and 2 commits past the applied snapshot: still serves, answers
    // PINNED to the applied (create-time) snapshot — the declared trade
    spark.sql("INSERT INTO gv.db.sfact VALUES (4, 0, 40, 'r3')")
    assert(readsMv, "lag 1 ≤ tolerance 2 must serve")
    assert(rows(q + " ORDER BY region") == c0,
      "a stale serve answers from the APPLIED snapshot")
    spark.sql("INSERT INTO gv.db.sfact VALUES (5, 0, 50, 'r3')")
    assert(readsMv, "lag 2 ≤ tolerance 2 must serve")

    // 3 commits past: beyond tolerance → base scan, fully fresh values
    spark.sql("INSERT INTO gv.db.sfact VALUES (6, 0, 60, 'r4')")
    assert(!readsMv, "lag 3 > tolerance 2 must fall back")
    assert(rows(q + " ORDER BY region") == Seq(
      Seq("r1", 2L, 30L), Seq("r2", 1L, 5L), Seq("r3", 2L, 90L),
      Seq("r4", 1L, 60L)))

    // refresh restores eligibility AND currency
    rows("CALL gv.system.refresh_mv('db.sfact_mv')")
    assert(readsMv, "refreshed serves again")
    assert(rows(q + " ORDER BY region") == Seq(
      Seq("r1", 2L, 30L), Seq("r2", 1L, 5L), Seq("r3", 2L, 90L),
      Seq("r4", 1L, 60L)))

    // ALTER retunes the budget post-create: widen it past the lag and
    // the stale MV serves again; back to exact and it falls back. The
    // MV stays CURRENT here (just refreshed), so we age it first.
    spark.sql("INSERT INTO gv.db.sfact VALUES (7, 0, 70, 'r4')")
    spark.sql("INSERT INTO gv.db.sfact VALUES (8, 0, 80, 'r4')")
    spark.sql("INSERT INTO gv.db.sfact VALUES (9, 0, 90, 'r4')")
    assert(!readsMv, "lag 3 > tolerance 2")
    spark.sql(
      "ALTER TABLE gv.db.sfact_mv SET TBLPROPERTIES ('maxStaleness'='10')")
    assert(readsMv, "the widened budget must serve the lagging MV again")
    spark.sql("ALTER TABLE gv.db.sfact_mv UNSET TBLPROPERTIES ('maxStaleness')")
    assert(!readsMv, "dropping the budget restores the exact gate")
    // and on a NON-MV table the property refuses
    intercept[Exception](spark.sql(
      "ALTER TABLE gv.db.sfact SET TBLPROPERTIES ('maxStaleness'='5')"))

    // an unknown property must fail loudly, not be silently dropped
    val err = intercept[Exception](spark.sql(
      """CREATE MATERIALIZED VIEW gv.db.sfact_mv2 TBLPROPERTIES (bogus='1')
         AS SELECT region, count(*) AS n FROM gv.db.sfact GROUP BY region"""))
    assert(err.getMessage.contains("bogus"))
    // and a malformed tolerance too
    intercept[Exception](spark.sql(
      """CREATE MATERIALIZED VIEW gv.db.sfact_mv3 TBLPROPERTIES (maxStaleness='-1')
         AS SELECT region, count(*) AS n FROM gv.db.sfact GROUP BY region"""))
  }

  test("wall-clock maxStaleness: serves inside the window, falls back beyond") {
    wh
    spark.sql("""CREATE TABLE gv.db.tfact (pk BIGINT, ts INT, qty INT, region STRING)
                 USING graft TBLPROPERTIES (keyCols='pk', precombineCol='ts')""")
    spark.sql("""INSERT INTO gv.db.tfact VALUES
      (1, 0, 10, 'r1'), (2, 0, 20, 'r1'), (3, 0, 5, 'r2')""")
    spark.sql("""CREATE MATERIALIZED VIEW gv.db.tfact_mv
      TBLPROPERTIES (maxStaleness='24h') AS
      SELECT region, count(*) AS n, sum(CAST(qty AS BIGINT)) AS total
      FROM gv.db.tfact GROUP BY region""")
    val q = """SELECT region, count(*) AS n, sum(CAST(qty AS BIGINT)) AS total
               FROM gv.db.tfact GROUP BY region"""
    def readsMv: Boolean =
      spark.sql(q).queryExecution.optimizedPlan.collect {
        case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          l.relation match {
            case h: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
              h.location.rootPaths.map(_.toString)
            case _ => Seq.empty[String]
          }
      }.flatten.exists(_.contains("tfact_mv"))
    val c0 = Seq(Seq("r1", 2L, 30L), Seq("r2", 1L, 5L))
    assert(readsMv, "exactly fresh serves")

    // an unapplied commit SECONDS old is far inside the 24h window:
    // serves, answers pinned to the applied snapshot
    spark.sql("INSERT INTO gv.db.tfact VALUES (4, 0, 40, 'r3')")
    assert(readsMv, "seconds-old staleness inside '24h' must serve")
    assert(rows(q + " ORDER BY region") == c0,
      "a time-gated stale serve answers from the APPLIED snapshot")

    // shrink the window under the unapplied commit's age → falls back
    spark.sql("ALTER TABLE gv.db.tfact_mv SET TBLPROPERTIES ('maxStaleness'='1ms')")
    Thread.sleep(50)
    assert(!readsMv, "the unapplied commit is older than 1ms — must fall back")
    assert(rows(q + " ORDER BY region") ==
      Seq(Seq("r1", 2L, 30L), Seq("r2", 1L, 5L), Seq("r3", 1L, 40L)))

    // widen it back → serves the pinned snapshot again
    spark.sql("ALTER TABLE gv.db.tfact_mv SET TBLPROPERTIES ('maxStaleness'='2h')")
    assert(readsMv, "the widened time budget must serve again")
    assert(rows(q + " ORDER BY region") == c0)

    // refresh → exact currency regardless of the window
    rows("CALL gv.system.refresh_mv('db.tfact_mv')")
    assert(readsMv)
    assert(rows(q + " ORDER BY region") ==
      Seq(Seq("r1", 2L, 30L), Seq("r2", 1L, 5L), Seq("r3", 1L, 40L)))

    // malformed duration refuses loudly
    val err = intercept[Exception](spark.sql(
      "ALTER TABLE gv.db.tfact_mv SET TBLPROPERTIES ('maxStaleness'='5x')"))
    assert(err.getMessage.contains("maxStaleness"))
  }

  test("WHERE + star-join in one MV definition maintains and rewrites") {
    wh
    spark.sql("""CREATE TABLE gv.db.jffact (pk BIGINT, ts INT, qty INT, rk STRING)
                 USING graft TBLPROPERTIES (keyCols='pk', precombineCol='ts')""")
    spark.sql("""CREATE TABLE gv.db.jfdim (rk STRING, ts INT, rname STRING)
                 USING graft TBLPROPERTIES (keyCols='rk', precombineCol='ts')""")
    spark.sql("""INSERT INTO gv.db.jffact VALUES
      (1, 0, 10, 'a'), (2, 0, -2, 'a'), (3, 0, 5, 'b'), (4, 0, 7, 'b')""")
    spark.sql("INSERT INTO gv.db.jfdim VALUES ('a', 0, 'alpha'), ('b', 0, 'beta')")
    spark.sql("""CREATE MATERIALIZED VIEW gv.db.jf_mv AS
      SELECT d.rname, count(*) AS n, sum(CAST(f.qty AS BIGINT)) AS total
      FROM gv.db.jffact f JOIN gv.db.jfdim d ON f.rk = d.rk
      WHERE f.qty > 0
      GROUP BY d.rname""")
    val q = """SELECT d.rname, count(*) AS n, sum(CAST(f.qty AS BIGINT)) AS total
               FROM gv.db.jffact f JOIN gv.db.jfdim d ON f.rk = d.rk
               WHERE f.qty > 0 GROUP BY d.rname"""
    def readsMv: Boolean =
      spark.sql(q).queryExecution.optimizedPlan.collect {
        case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          l.relation match {
            case h: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
              h.location.rootPaths.map(_.toString)
            case _ => Seq.empty[String]
          }
      }.flatten.exists(_.contains("jf_mv"))
    assert(readsMv, "fresh filtered star-join MV must serve")
    assert(rows(q + " ORDER BY d.rname") ==
      Seq(Seq("alpha", 1L, 10L), Seq("beta", 2L, 12L)))
    // a query NOT restating the baked-in filter must not read the MV
    val unfiltered = """SELECT d.rname, count(*) AS n
      FROM gv.db.jffact f JOIN gv.db.jfdim d ON f.rk = d.rk GROUP BY d.rname"""
    assert(!spark.sql(unfiltered).queryExecution.optimizedPlan.toString
      .contains("jf_mv"))

    // fact delta (one row passes the filter, one is filtered out):
    // stale → falls back; refresh composes delta-filter + dim-join
    spark.sql("INSERT INTO gv.db.jffact VALUES (5, 0, 100, 'a'), (6, 0, -9, 'b')")
    assert(!readsMv, "stale filtered star-join MV must fall back")
    rows("CALL gv.system.refresh_mv('db.jf_mv')")
    assert(readsMv, "refreshed filtered star-join MV must serve again")
    assert(rows(q + " ORDER BY d.rname") ==
      Seq(Seq("alpha", 2L, 110L), Seq("beta", 2L, 12L)))
  }

  test("filtered MV: WHERE in the definition maintains and rewrites") {
    wh
    spark.sql("""CREATE TABLE gv.db.factf (pk BIGINT, ts INT, qty INT, region STRING)
                 USING graft TBLPROPERTIES (keyCols='pk', precombineCol='ts')""")
    spark.sql("""INSERT INTO gv.db.factf VALUES
      (1, 0, 10, 'r1'), (2, 0, 20, 'r1'), (3, 0, 5, 'r2'), (4, 0, -3, 'r2')""")
    spark.sql("""CREATE MATERIALIZED VIEW gv.db.factf_mv AS
      SELECT region, count(*) AS n, sum(CAST(qty AS BIGINT)) AS total
      FROM gv.db.factf WHERE qty > 0 GROUP BY region""")

    def readsMv(sql: String): Boolean =
      spark.sql(sql).queryExecution.optimizedPlan.collect {
        case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          l.relation match {
            case h: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
              h.location.rootPaths.map(_.toString)
            case _ => Seq.empty[String]
          }
      }.flatten.exists(_.contains("factf_mv"))

    // the MV itself holds the filtered aggregate
    assert(rows("SELECT region, n, total FROM gv.db.factf_mv ORDER BY region") ==
      Seq(Seq("r1", 2L, 30L), Seq("r2", 1L, 5L)))

    // a query restating the predicate rewrites; extra dim-only conjuncts
    // stay as a residual on the MV
    val q = """SELECT region, count(*) AS n FROM gv.db.factf
               WHERE qty > 0 GROUP BY region"""
    assert(readsMv(q))
    assert(rows(q + " ORDER BY region") == Seq(Seq("r1", 2L), Seq("r2", 1L)))
    val qr = """SELECT region, count(*) AS n FROM gv.db.factf
                WHERE qty > 0 AND region = 'r1' GROUP BY region"""
    assert(readsMv(qr))
    assert(rows(qr) == Seq(Seq("r1", 2L)))

    // a query NOT implying the MV predicate must fall back (unfiltered,
    // weaker, or different predicate)
    val unf = "SELECT region, count(*) AS n FROM gv.db.factf GROUP BY region"
    assert(!readsMv(unf))
    assert(rows(unf + " ORDER BY region") == Seq(Seq("r1", 2L), Seq("r2", 2L)))
    assert(!readsMv("""SELECT region, count(*) AS n FROM gv.db.factf
                       WHERE qty > 1 GROUP BY region"""))

    // incremental refresh maintains the filtered aggregate: a row moving
    // ACROSS the predicate boundary retracts, one moving in contributes
    spark.sql("INSERT INTO gv.db.factf VALUES (2, 1, -20, 'r1'), (4, 1, 8, 'r2')")
    rows("CALL gv.system.refresh_mv('db.factf_mv')")
    assert(rows("SELECT region, n, total FROM gv.db.factf_mv ORDER BY region") ==
      Seq(Seq("r1", 1L, 10L), Seq("r2", 2L, 13L)))
    assert(readsMv(q))
    assert(rows(q + " ORDER BY region") == Seq(Seq("r1", 1L), Seq("r2", 2L)))

    // nondeterministic / subquery-bearing definitions refuse loudly
    intercept[UnsupportedOperationException] {
      spark.sql("""CREATE MATERIALIZED VIEW gv.db.factf_bad AS
        SELECT region, count(*) AS n FROM gv.db.factf
        WHERE qty > rand() * 10 GROUP BY region""")
    }
  }

  test("ON-keyed and LEFT OUTER star-schema MVs maintain and rewrite") {
    wh
    spark.sql("""CREATE TABLE gv.db.ofact (pk BIGINT, ts INT, qty INT, rk INT)
                 USING graft TBLPROPERTIES (keyCols='pk', precombineCol='ts')""")
    spark.sql("""CREATE TABLE gv.db.odim (id INT, ts INT, region STRING)
                 USING graft TBLPROPERTIES (keyCols='id', precombineCol='ts')""")
    spark.sql("INSERT INTO gv.db.odim VALUES (1, 0, 'r1'), (2, 0, 'r2')")
    // rk=3 has no dim row: inner drops it, left null-extends it
    spark.sql("""INSERT INTO gv.db.ofact VALUES
      (1, 0, 10, 1), (2, 0, 20, 1), (3, 0, 5, 2), (4, 0, 7, 3)""")
    spark.sql("""CREATE MATERIALIZED VIEW gv.db.omv AS
      SELECT d.region, count(*) AS n, sum(CAST(f.qty AS BIGINT)) AS total
      FROM gv.db.ofact f JOIN gv.db.odim d ON f.rk = d.id
      GROUP BY d.region""")
    spark.sql("""CREATE MATERIALIZED VIEW gv.db.lmv AS
      SELECT d.region, count(*) AS n, sum(CAST(f.qty AS BIGINT)) AS total
      FROM gv.db.ofact f LEFT JOIN gv.db.odim d ON f.rk = d.id
      GROUP BY d.region""")

    def readsOnly(sql: String, mv: String): Boolean = {
      val roots = spark.sql(sql).queryExecution.optimizedPlan.collect {
        case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          l.relation match {
            case h: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
              h.location.rootPaths.map(_.toString)
            case _ => Seq.empty[String]
          }
      }.flatten
      roots.exists(_.contains(mv)) && !roots.exists(_.contains("ofact"))
    }
    val qi = """SELECT d.region, count(*) AS n, sum(CAST(f.qty AS BIGINT)) AS total
                FROM gv.db.ofact f JOIN gv.db.odim d ON f.rk = d.id
                GROUP BY d.region"""
    val ql = """SELECT d.region, count(*) AS n, sum(CAST(f.qty AS BIGINT)) AS total
                FROM gv.db.ofact f LEFT JOIN gv.db.odim d ON f.rk = d.id
                GROUP BY d.region"""
    // each query must land on the MV with the MATCHING join type
    assert(readsOnly(qi, "omv"), "inner query must read the inner MV")
    assert(readsOnly(ql, "lmv"), "left query must read the LEFT MV")
    assert(rows(qi + " ORDER BY region") ==
      Seq(Seq("r1", 2L, 30L), Seq("r2", 1L, 5L)))
    assert(rows(ql + " ORDER BY region NULLS FIRST") ==
      Seq(Seq(null, 1L, 7L), Seq("r1", 2L, 30L), Seq("r2", 1L, 5L)))

    // fact moves (one row flips INTO the dim, one new unmatched row):
    // both MVs refresh incrementally, both rewrites resume
    spark.sql("INSERT INTO gv.db.ofact VALUES (4, 1, 7, 2), (5, 0, 100, 9)")
    assert(!readsOnly(qi, "omv") && !readsOnly(ql, "lmv"))
    rows("CALL gv.system.refresh_mv('db.omv')")
    rows("CALL gv.system.refresh_mv('db.lmv')")
    assert(readsOnly(qi, "omv") && readsOnly(ql, "lmv"))
    assert(rows(qi + " ORDER BY region") ==
      Seq(Seq("r1", 2L, 30L), Seq("r2", 2L, 12L)))
    assert(rows(ql + " ORDER BY region NULLS FIRST") ==
      Seq(Seq(null, 1L, 100L), Seq("r1", 2L, 30L), Seq("r2", 2L, 12L)))

    // a LEFT dim key sharing the fact key's NAME and referenced on the
    // dim side refuses loudly (fact value vs null-extension diverge)
    spark.sql("""CREATE TABLE gv.db.odim3 (rk INT, ts INT, region STRING)
                 USING graft TBLPROPERTIES (keyCols='rk', precombineCol='ts')""")
    spark.sql("INSERT INTO gv.db.odim3 VALUES (1, 0, 'x')")
    val err = intercept[UnsupportedOperationException] {
      spark.sql("""CREATE MATERIALIZED VIEW gv.db.badlmv AS
        SELECT d.rk, count(*) AS n
        FROM gv.db.ofact f LEFT JOIN gv.db.odim3 d ON f.rk = d.rk
        GROUP BY d.rk""")
    }
    assert(err.getMessage.contains("LEFT"))
  }

  test("star-schema MV: join in the definition maintains and rewrites") {
    wh
    spark.sql("""CREATE TABLE gv.db.jfact (pk BIGINT, ts INT, qty INT, rk INT)
                 USING graft TBLPROPERTIES (keyCols='pk', precombineCol='ts')""")
    spark.sql("""CREATE TABLE gv.db.jdim (rk INT, ts INT, region STRING)
                 USING graft TBLPROPERTIES (keyCols='rk', precombineCol='ts')""")
    spark.sql("INSERT INTO gv.db.jdim VALUES (1, 0, 'r1'), (2, 0, 'r2')")
    spark.sql("""INSERT INTO gv.db.jfact VALUES
      (1, 0, 10, 1), (2, 0, 20, 1), (3, 0, 5, 2), (4, 0, 7, 3)""")
    // rk=3 has no dim row: inner join drops it
    spark.sql("""CREATE MATERIALIZED VIEW gv.db.jmv AS
      SELECT d.region, count(*) AS n, sum(CAST(f.qty AS BIGINT)) AS total
      FROM gv.db.jfact f JOIN gv.db.jdim d ON f.rk = d.rk
      GROUP BY d.region""")

    def readsMv(sql: String): Boolean =
      spark.sql(sql).queryExecution.optimizedPlan.collect {
        case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          l.relation match {
            case h: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
              h.location.rootPaths.map(_.toString)
            case _ => Seq.empty[String]
          }
      }.flatten.exists(_.contains("jmv"))

    assert(rows("SELECT region, n, total FROM gv.db.jmv ORDER BY region") ==
      Seq(Seq("r1", 2L, 30L), Seq("r2", 1L, 5L)))

    // the SAME join+aggregate against the base tables rewrites onto the MV
    val q = """SELECT d.region, count(*) AS n, sum(CAST(f.qty AS BIGINT)) AS total
               FROM gv.db.jfact f JOIN gv.db.jdim d ON f.rk = d.rk
               GROUP BY d.region"""
    assert(readsMv(q), "fresh star-schema MV must answer the join aggregate")
    assert(rows(q + " ORDER BY region") ==
      Seq(Seq("r1", 2L, 30L), Seq("r2", 1L, 5L)))
    // a query with a DIFFERENT join shape falls back (no dim join)
    assert(!readsMv("SELECT rk, count(*) AS n FROM gv.db.jfact GROUP BY rk"))

    // FACT moves → stale → fallback; incremental refresh resumes rewrite
    spark.sql("INSERT INTO gv.db.jfact VALUES (5, 0, 100, 2)")
    assert(!readsMv(q))
    assert(rows(q + " ORDER BY region") ==
      Seq(Seq("r1", 2L, 30L), Seq("r2", 2L, 105L)))
    rows("CALL gv.system.refresh_mv('db.jmv')")
    assert(readsMv(q))
    assert(rows("SELECT region, n, total FROM gv.db.jmv ORDER BY region") ==
      Seq(Seq("r1", 2L, 30L), Seq("r2", 2L, 105L)))

    // DIM moves → full rebuild on refresh, values track the new dim rows
    spark.sql("INSERT INTO gv.db.jdim VALUES (3, 1, 'r3'), (2, 1, 'r2x')")
    assert(!readsMv(q), "a moved dim must disqualify the rewrite")
    rows("CALL gv.system.refresh_mv('db.jmv')")
    assert(rows("SELECT region, n, total FROM gv.db.jmv ORDER BY region") ==
      Seq(Seq("r1", 2L, 30L), Seq("r2x", 2L, 105L), Seq("r3", 1L, 7L)))
    assert(readsMv(q))
    assert(rows(q + " ORDER BY region") ==
      Seq(Seq("r1", 2L, 30L), Seq("r2x", 2L, 105L), Seq("r3", 1L, 7L)))

    // a REFERENCED name on both sides of a join refuses loudly
    // (unreferenced housekeeping overlap like `ts` is fine — jdim shares
    // it with jfact above and the MV created regardless)
    spark.sql("""CREATE TABLE gv.db.jdim2 (rk INT, ts INT, qty INT)
                 USING graft TBLPROPERTIES (keyCols='rk', precombineCol='ts')""")
    spark.sql("INSERT INTO gv.db.jdim2 VALUES (1, 0, 9)")
    val amb = intercept[UnsupportedOperationException] {
      spark.sql("""CREATE MATERIALIZED VIEW gv.db.jmv_bad AS
        SELECT f.rk, sum(CAST(f.qty AS BIGINT)) AS s
        FROM gv.db.jfact f JOIN gv.db.jdim2 d ON f.rk = d.rk
        GROUP BY f.rk""")
    }
    assert(amb.getMessage.contains("ambiguous"))
  }

  test("MV schema exposes only declared columns (count hidden when not projected)") {
    wh
    spark.sql("""CREATE TABLE gv.db.facth (pk BIGINT, ts INT, qty INT, region STRING)
                 USING graft TBLPROPERTIES (keyCols='pk', precombineCol='ts')""")
    spark.sql("INSERT INTO gv.db.facth VALUES (1, 0, 10, 'r1'), (2, 0, 5, 'r2')")
    // definition projects only a sum — the maintained count and the
    // per-sum non-null count must stay engine-internal
    spark.sql("""CREATE MATERIALIZED VIEW gv.db.facth_mv AS
      SELECT region, sum(CAST(qty AS BIGINT)) AS total
      FROM gv.db.facth GROUP BY region""")
    val cols = spark.sql("SELECT * FROM gv.db.facth_mv").schema.fieldNames.toSet
    assert(!cols.contains("n_rows"), s"maintained count leaked: $cols")
    assert(!cols.exists(_.startsWith("__nn_")), s"nn internals leaked: $cols")
    assert(cols.contains("region") && cols.contains("total"))
    // count(*) queries still rewrite onto the hidden maintained count
    def readsMv(sql: String): Boolean =
      spark.sql(sql).queryExecution.optimizedPlan.collect {
        case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          l.relation match {
            case h: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
              h.location.rootPaths.map(_.toString)
            case _ => Seq.empty[String]
          }
      }.flatten.exists(_.contains("facth_mv"))
    val q = "SELECT region, count(*) AS n FROM gv.db.facth GROUP BY region"
    assert(readsMv(q))
    assert(rows(q + " ORDER BY region") == Seq(Seq("r1", 1L), Seq("r2", 1L)))
  }
}
