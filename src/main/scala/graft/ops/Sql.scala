package graft.ops

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.SparkSession
import graft.{GQuery, Tables => T}

/** SQL-DML queries: the reference's read path is catalog SQL
  * (`glue/MockCuratedGlueJob.py:17-19`); the modern lakehouse write path
  * is SQL DML. These queries drive the ENTIRE statement path through
  * `spark.sql` against the graft DSv2 catalog ([[graft.sql.GraftCatalog]])
  * — CREATE TABLE / INSERT INTO / UPDATE / DELETE / MERGE INTO /
  * VERSION AS OF — and oracle-check the resulting snapshots in DuckDB.
  *
  * The session must be built with
  * `spark.sql.extensions=graft.GraftExtensions` (Verify/Bench are);
  * the catalog itself is registered at fixture time via runtime conf.
  */
object Sql {

  /** one catalog per sf dir: Spark's CatalogManager caches the plugin
    * instance per NAME on first use, so the warehouse must be encoded in
    * the catalog name, not swapped through conf */
  private def catName(d: String): String =
    "gsql_" + d.replaceAll("[^A-Za-z0-9]", "_")

  private val built = new ConcurrentHashMap[String, String]()

  /** CREATE + seed + UPDATE + DELETE over `nation`, all via spark.sql;
    * returns the catalog name. Timeline: c0 = INSERT (update_ts 0),
    * c1 = stale INSERT (loses to precombine), c2 = UPDATE, c3 = DELETE.
    */
  private[graft] def dmlFixture(s: SparkSession, d: String): String =
    // keyed by SESSION identity: catalog conf and temp views are
    // per-SparkSession state, and sessions over one SparkContext share
    // an applicationId — a fresh session must rebuild its own fixture
    built.computeIfAbsent(s"${System.identityHashCode(s)}:$d:dml", _ => {
      val cat = catName(d)
      val wh = s"/tmp/graft_lake/sqlwh_${d.replaceAll("[^A-Za-z0-9.]", "_")}"
      val fs = new org.apache.hadoop.fs.Path(wh)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(wh), true)
      s.conf.set(s"spark.sql.catalog.$cat", "graft.sql.GraftCatalog")
      s.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
      s.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.db")

      val nation = T.nation(s, d)
      nation.createOrReplaceTempView("sql_nation_src")
      // statsCols: per-file n_nationkey bounds in the commit log — feeds
      // both file skipping and the lake_sql_stats_agg metadata answers
      s.sql(s"""CREATE TABLE $cat.db.nation (${nation.schema.toDDL}, update_ts INT)
        USING graft PARTITIONED BY (n_regionkey)
        TBLPROPERTIES (keyCols='n_nationkey', precombineCol='update_ts',
          statsCols='n_nationkey')""")
      // c0: full seed
      s.sql(s"INSERT INTO $cat.db.nation SELECT *, 0 FROM sql_nation_src")
      // c1: stale re-insert of region 1 with mangled names — precombine
      // (equal ts, lower arrival... equal ts ties to the TABLE's row via
      // commit id) — use LOWER ts to make the loss unambiguous
      s.sql(s"""INSERT INTO $cat.db.nation
        SELECT n_nationkey, concat(n_name, '_STALE'), n_regionkey, -1
        FROM sql_nation_src WHERE n_regionkey = 1""")
      // c2: UPDATE region-2 names (assignments read the OLD row)
      s.sql(s"""UPDATE $cat.db.nation
        SET n_name = concat(n_name, '!'), update_ts = 7 WHERE n_regionkey = 2""")
      // c3: DELETE a key range (range predicates translate to source
      // Filters, so this exercises the SupportsDelete pushdown path)
      s.sql(s"DELETE FROM $cat.db.nation WHERE n_nationkey >= 20")
      // named tag on the seed commit (Iceberg tag ref): resolves in
      // `VERSION AS OF 'seed.v0'` (lake_sql_tag_read) and pins c0
      // against the cleaner
      s.sql(s"CALL $cat.system.create_tag('db.nation', 'seed.v0', 0L)")
        .collect()
      cat
    })

  /** seed `nation_dyn`, then DYNAMIC `INSERT OVERWRITE` region 2 only
    * (partitionOverwriteMode=dynamic): the batch's partitions are
    * replaced wholesale, every other partition untouched. */
  private[graft] def dynFixture(s: SparkSession, d: String): String = {
    // OUTSIDE the computeIfAbsent: a nested computeIfAbsent on the same
    // map can throw IllegalStateException("Recursive update") when the
    // keys share a bin — same hazard the other fixtures hoist around
    val cat = dmlFixture(s, d) // registers the catalog + sql_nation_src
    built.computeIfAbsent(s"${System.identityHashCode(s)}:$d:dyn", _ => {
      val nation = T.nation(s, d)
      s.sql(s"""CREATE TABLE $cat.db.nation_dyn (${nation.schema.toDDL}, update_ts INT)
        USING graft PARTITIONED BY (n_regionkey)
        TBLPROPERTIES (keyCols='n_nationkey', precombineCol='update_ts')""")
      s.sql(s"INSERT INTO $cat.db.nation_dyn SELECT *, 0 FROM sql_nation_src")
      val saved = s.conf.getOption("spark.sql.sources.partitionOverwriteMode")
      s.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      try
        s.sql(s"""INSERT OVERWRITE $cat.db.nation_dyn
          SELECT n_nationkey, concat(n_name, '_NEW'), n_regionkey, 1
          FROM sql_nation_src WHERE n_regionkey = 2""")
      finally saved match {
        case Some(v) => s.conf.set("spark.sql.sources.partitionOverwriteMode", v)
        case None => s.conf.unset("spark.sql.sources.partitionOverwriteMode")
      }
      // static PARTITION-spec overwrite (replaceWhere, default mode):
      // region 4 clears wholesale and re-lands with '_RW' names, ts=2
      s.sql(s"""INSERT OVERWRITE $cat.db.nation_dyn PARTITION (n_regionkey = 4)
        SELECT n_nationkey, concat(n_name, '_RW'), 2
        FROM sql_nation_src WHERE n_regionkey = 4""")
      cat
    })
  }

  /** MoR catalog table for the `db.t.ro` read-optimized view: c0 = seed
    * insert (lands as BASE — nothing to merge into), c1 = delta insert
    * updating region-3 names. `.ro` must see exactly the c0 state while
    * the snapshot merges the delta.
    */
  private[graft] def morFixture(s: SparkSession, d: String): String = {
    val cat = dmlFixture(s, d) // hoisted: registers catalog + src view
    built.computeIfAbsent(s"${System.identityHashCode(s)}:$d:mor", _ => {
      val nation = T.nation(s, d)
      // own table name — `nation_mor` belongs to the stream-tail fixture
      // (r12 bench found the collision: its DROP+CREATE raced this one);
      // DROP IF EXISTS guards against a half-built stale warehouse too
      s.sql(s"DROP TABLE IF EXISTS $cat.db.nation_ro")
      s.sql(s"""CREATE TABLE $cat.db.nation_ro (${nation.schema.toDDL}, update_ts INT)
        USING graft TBLPROPERTIES (keyCols='n_nationkey',
          precombineCol='update_ts', storageType='mor')""")
      s.sql(s"INSERT INTO $cat.db.nation_ro SELECT *, 0 FROM sql_nation_src")
      s.sql(s"""INSERT INTO $cat.db.nation_ro
        SELECT n_nationkey, concat(n_name, '_D'), n_regionkey, 1
        FROM sql_nation_src WHERE n_regionkey = 3""")
      cat
    })
  }

  /** a second lake table co-partitioned with `nation` on the region key
    * (one partition per region) for the storage-partitioned join entry,
    * plus the session flag that lets Spark USE reported key-grouped
    * partitioning. The flag stays set for the session deliberately: it
    * is a pure planning capability (plans that cannot use it are
    * untouched; plans that can skip shuffles), and the gate re-proves
    * every query's RESULTS either way. */
  private[graft] def spjFixture(s: SparkSession, d: String): String = {
    val cat = dmlFixture(s, d) // hoisted: nested computeIfAbsent hazard
    built.computeIfAbsent(s"${System.identityHashCode(s)}:$d:spj", _ => {
      s.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
      val region = T.region(s, d)
      region.createOrReplaceTempView("sql_region_src")
      s.sql(s"""CREATE TABLE $cat.db.region_spj (${region.schema.toDDL}, update_ts INT)
        USING graft PARTITIONED BY (r_regionkey)
        TBLPROPERTIES (keyCols='r_regionkey', precombineCol='update_ts')""")
      s.sql(s"INSERT INTO $cat.db.region_spj SELECT *, 0 FROM sql_region_src")
      cat
    })
  }

  /** write-audit-publish fixture: seed `nation_wap`, shallow-clone it to
    * `nation_wap_audit`, land audited changes on the CLONE (region-3
    * names get '~', keys >= 20 deleted), then `CALL publish` fast-
    * forwards the audit's net effect onto the source in one commit. */
  private[graft] def wapFixture(s: SparkSession, d: String): String = {
    val cat = dmlFixture(s, d) // hoisted: nested computeIfAbsent hazard
    built.computeIfAbsent(s"${System.identityHashCode(s)}:$d:wap", _ => {
      s.sql(s"""CREATE TABLE $cat.db.nation_wap
        (n_nationkey BIGINT, n_name STRING, n_regionkey INT, update_ts INT)
        USING graft PARTITIONED BY (n_regionkey)
        TBLPROPERTIES (keyCols='n_nationkey', precombineCol='update_ts')""")
      s.sql(s"""INSERT INTO $cat.db.nation_wap
        SELECT n_nationkey, n_name, n_regionkey, 0 FROM sql_nation_src""")
      s.sql(s"CALL $cat.system.clone('db.nation_wap', 'db.nation_wap_audit', -1L)")
        .collect()
      s.sql(s"""UPDATE $cat.db.nation_wap_audit
        SET n_name = concat(n_name, '~'), update_ts = 1 WHERE n_regionkey = 3""")
      s.sql(s"DELETE FROM $cat.db.nation_wap_audit WHERE n_nationkey >= 20")
      s.sql(s"CALL $cat.system.publish('db.nation_wap', 'db.nation_wap_audit')")
        .collect()
      cat
    })
  }

  /** hidden-partitioning fixture (Iceberg transform layout through pure
    * SQL DDL): `orders_hp` partitioned by `months(o_orderdate)` +
    * `bucket(4, o_custkey)`. The source columns stay normal data
    * columns; the ~80-month × 4-bucket directory tree exists only for
    * pruning — a date-range predicate keeps the months it covers, a
    * custkey equality keeps one bucket in each. */
  private[graft] def hiddenFixture(s: SparkSession, d: String): String = {
    val cat = dmlFixture(s, d) // hoisted: nested computeIfAbsent hazard
    built.computeIfAbsent(s"${System.identityHashCode(s)}:$d:hidden", _ => {
      T.orders(s, d).createOrReplaceTempView("sql_orders_src")
      s.sql(s"""CREATE TABLE $cat.db.orders_hp
        (o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus STRING,
         o_totalprice DOUBLE, o_orderdate TIMESTAMP, o_orderpriority STRING,
         update_ts INT)
        USING graft
        PARTITIONED BY (months(o_orderdate), bucket(4, o_custkey))
        TBLPROPERTIES (keyCols='o_orderkey', precombineCol='update_ts',
          globalIndex='true')""")
      s.sql(s"""INSERT INTO $cat.db.orders_hp
        SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
          o_orderdate, o_orderpriority, 0
        FROM sql_orders_src""")
      cat
    })
  }

  /** deleteMode='dv' SQL fixture: a CoW table whose DELETE FROM routes
    * through position-delete sidecars ([[graft.lake.LakeTable.deleteDv]])
    * instead of the keyed rewrite — same catalog as the DML fixture. */
  private[graft] def dvSqlFixture(s: SparkSession, d: String): String = {
    // dependency resolved OUTSIDE the lambda (nested computeIfAbsent on
    // one map throws "Recursive update" — same discipline as mergeFixture)
    val cat = dmlFixture(s, d) // registers the catalog + source view
    built.computeIfAbsent(s"${System.identityHashCode(s)}:$d:dvsql", _ => {
      val nation = T.nation(s, d)
      s.sql(s"""CREATE TABLE $cat.db.dvnation (${nation.schema.toDDL},
        update_ts INT) USING graft PARTITIONED BY (n_regionkey)
        TBLPROPERTIES (keyCols='n_nationkey', precombineCol='update_ts',
          deleteMode='dv')""")
      s.sql(s"INSERT INTO $cat.db.dvnation SELECT *, 0 FROM sql_nation_src")
      s.sql(s"DELETE FROM $cat.db.dvnation WHERE n_nationkey IN (2, 7, 12, 17, 22)")
      // sibling table for the DV row-level UPDATE (updateMode='dv'):
      // position sidecars + new version files, one commit, no rewrite
      s.sql(s"""CREATE TABLE $cat.db.dvnation_u (${nation.schema.toDDL},
        update_ts INT) USING graft PARTITIONED BY (n_regionkey)
        TBLPROPERTIES (keyCols='n_nationkey', precombineCol='update_ts',
          updateMode='dv')""")
      s.sql(s"INSERT INTO $cat.db.dvnation_u SELECT *, 0 FROM sql_nation_src")
      s.sql(s"""UPDATE $cat.db.dvnation_u
        SET n_name = concat(n_name, '*'), update_ts = 3
        WHERE n_regionkey = 1""")
      cat
    })
  }

  /** the mergeTable clause set (ops.Lake) issued as ONE SQL MERGE INTO —
    * update/delete/insert/by-source-delete in a single statement */
  private[graft] def mergeFixture(s: SparkSession, d: String): String =
    {
    // dependency resolved OUTSIDE the lambda: a nested
    // computeIfAbsent on one map throws "Recursive update" whenever
    // the two keys share a bin — which key set and hashing decide,
    // not the code; hoisting makes it structurally impossible
    val cat = dmlFixture(s, d)
    built.computeIfAbsent(s"${System.identityHashCode(s)}:$d:merge", _ => {
      s.sql(s"DROP TABLE IF EXISTS $cat.db.li")
      s.sql(s"""CREATE TABLE $cat.db.li (
          l_orderkey BIGINT, l_linenumber INT, l_returnflag STRING,
          l_quantity DOUBLE, update_ts INT)
        USING graft PARTITIONED BY (l_returnflag)
        TBLPROPERTIES (keyCols='l_orderkey,l_linenumber', precombineCol='update_ts')""")
      T.lineitem(s, d).createOrReplaceTempView("sql_li_src")
      s.sql(s"""INSERT INTO $cat.db.li
        SELECT l_orderkey, l_linenumber, max(l_returnflag),
               CAST(max(l_quantity) AS DOUBLE), 0
        FROM sql_li_src GROUP BY l_orderkey, l_linenumber""")
      s.sql(s"""MERGE INTO $cat.db.li t USING (
          WITH li AS (SELECT l_orderkey, l_linenumber,
                max(l_returnflag) AS l_returnflag,
                CAST(max(l_quantity) AS DOUBLE) AS l_quantity
              FROM sql_li_src GROUP BY l_orderkey, l_linenumber),
          r AS (SELECT * FROM li WHERE l_returnflag = 'R')
          SELECT l_orderkey, l_linenumber, l_returnflag,
                 l_quantity + 500 AS l_quantity, 1 AS update_ts FROM r
          UNION ALL
          SELECT l_orderkey + 10000000, l_linenumber, l_returnflag,
                 l_quantity + 9000, 1 FROM r
        ) s
        ON t.l_returnflag = s.l_returnflag AND t.l_orderkey = s.l_orderkey
           AND t.l_linenumber = s.l_linenumber
        WHEN MATCHED AND t.l_linenumber = 1 THEN DELETE
        WHEN MATCHED THEN UPDATE SET l_quantity = s.l_quantity,
                                     update_ts = s.update_ts
        WHEN NOT MATCHED THEN INSERT *
        WHEN NOT MATCHED BY SOURCE AND t.l_returnflag = 'N' THEN DELETE""")
      cat
    })
  }

  /** Unpartitioned nation table hit by a MERGE whose ON clause carries a
    * RESIDUAL conjunct beyond the key equality (the Delta-idiomatic
    * `ON t.k = s.k AND t.region = ...` shape): the residual scopes the
    * matched clauses — region-1 rows with key >= 20 delete, region-1
    * rows below update, everything else is untouched (and in particular
    * key-matched rows failing the residual do NOT re-insert). */
  private[graft] def residualFixture(s: SparkSession, d: String): String =
    {
    // dependency resolved OUTSIDE the lambda: a nested
    // computeIfAbsent on one map throws "Recursive update" whenever
    // the two keys share a bin — which key set and hashing decide,
    // not the code; hoisting makes it structurally impossible
    val cat = dmlFixture(s, d)
    built.computeIfAbsent(s"${System.identityHashCode(s)}:$d:residual", _ => {
      s.sql(s"DROP TABLE IF EXISTS $cat.db.nation_res")
      s.sql(s"""CREATE TABLE $cat.db.nation_res (
          n_nationkey INT, n_name STRING, n_regionkey INT, update_ts INT)
        USING graft TBLPROPERTIES
        (keyCols='n_nationkey', precombineCol='update_ts')""")
      s.sql(s"INSERT INTO $cat.db.nation_res SELECT *, 0 FROM sql_nation_src")
      s.sql(s"""MERGE INTO $cat.db.nation_res t
        USING (SELECT *, 1 AS update_ts FROM sql_nation_src) s
        ON t.n_nationkey = s.n_nationkey AND t.n_regionkey = 1
        WHEN MATCHED AND t.n_nationkey >= 20 THEN DELETE
        WHEN MATCHED THEN UPDATE SET n_name = concat(t.n_name, '*'),
                                     update_ts = s.update_ts
        WHEN NOT MATCHED THEN INSERT *""")
      cat
    })
  }

  /** Staged creation end-to-end: CTAS materializes a transformed SELECT
    * into a brand-new table (atomic: descriptor lands last), then
    * REPLACE TABLE AS SELECT swaps it wholesale for a narrowed,
    * re-derived version — the final contents are what the oracle pins. */
  private[graft] def ctasFixture(s: SparkSession, d: String): String =
    {
    // dependency resolved OUTSIDE the lambda: a nested
    // computeIfAbsent on one map throws "Recursive update" whenever
    // the two keys share a bin — which key set and hashing decide,
    // not the code; hoisting makes it structurally impossible
    val cat = dmlFixture(s, d)
    built.computeIfAbsent(s"${System.identityHashCode(s)}:$d:ctas", _ => {
      s.sql(s"DROP TABLE IF EXISTS $cat.db.nation_ctas")
      s.sql(s"""CREATE TABLE $cat.db.nation_ctas USING graft
        TBLPROPERTIES (keyCols='n_nationkey', precombineCol='update_ts')
        AS SELECT n_nationkey, n_name, n_regionkey, 0 AS update_ts
        FROM sql_nation_src""")
      s.sql(s"""REPLACE TABLE $cat.db.nation_ctas USING graft
        TBLPROPERTIES (keyCols='n_nationkey', precombineCol='update_ts')
        AS SELECT n_nationkey, upper(n_name) AS n_name, n_regionkey,
                  1 AS update_ts
        FROM sql_nation_src WHERE n_regionkey <= 2""")
      cat
    })
  }

  /** MoR `nation` table tailed BY NAME through the DSv2 catalog — the
    * V1-fallback bridge ([[graft.sql.GraftTableV2.v1FallbackTable]])
    * resolves `readStream.table` to the commit-log tail source. Timeline:
    * c0 = seed (base load — not part of the change tail), c1 = delta
    * re-insert of region 1 (names marked `+`), c2 = delete tombstones
    * for keys >= 20. */
  private[graft] def tailFixture(s: SparkSession, d: String): String =
    {
    // dependency resolved OUTSIDE the lambda: a nested
    // computeIfAbsent on one map throws "Recursive update" whenever
    // the two keys share a bin — which key set and hashing decide,
    // not the code; hoisting makes it structurally impossible
    val cat = dmlFixture(s, d)
    built.computeIfAbsent(s"${System.identityHashCode(s)}:$d:tail", _ => {
      s.sql(s"DROP TABLE IF EXISTS $cat.db.nation_mor")
      s.sql(s"""CREATE TABLE $cat.db.nation_mor (
          n_nationkey INT, n_name STRING, n_regionkey INT, update_ts INT)
        USING graft TBLPROPERTIES
        (keyCols='n_nationkey', precombineCol='update_ts', storageType='mor')""")
      s.sql(s"INSERT INTO $cat.db.nation_mor SELECT *, 0 FROM sql_nation_src")
      s.sql(s"""INSERT INTO $cat.db.nation_mor
        SELECT n_nationkey, concat(n_name, '+'), n_regionkey, 1
        FROM sql_nation_src WHERE n_regionkey = 1""")
      s.sql(s"DELETE FROM $cat.db.nation_mor WHERE n_nationkey >= 20")
      cat
    })
  }

  /** CoW twin of [[tailFixture]] — the reference's own table type
    * (glue/HudiJarGlueJob.py:77 COPY_ON_WRITE). Same logical timeline;
    * the tail must emit the same EFFECTIVE changes even though every
    * commit physically rewrites whole files: c0 seed (on CoW the initial
    * load IS a change batch), c1 update of region 1, c2 tombstones for
    * keys >= 20 — carrying the values the keys held when deleted. */
  private[graft] def cowTailFixture(s: SparkSession, d: String): String =
    {
    // dependency resolved OUTSIDE the lambda: a nested
    // computeIfAbsent on one map throws "Recursive update" whenever
    // the two keys share a bin — which key set and hashing decide,
    // not the code; hoisting makes it structurally impossible
    val cat = dmlFixture(s, d)
    built.computeIfAbsent(s"${System.identityHashCode(s)}:$d:cowtail", _ => {
      s.sql(s"DROP TABLE IF EXISTS $cat.db.nation_cowt")
      s.sql(s"""CREATE TABLE $cat.db.nation_cowt (
          n_nationkey INT, n_name STRING, n_regionkey INT, update_ts INT)
        USING graft TBLPROPERTIES
        (keyCols='n_nationkey', precombineCol='update_ts')""")
      s.sql(s"INSERT INTO $cat.db.nation_cowt SELECT *, 0 FROM sql_nation_src")
      s.sql(s"""INSERT INTO $cat.db.nation_cowt
        SELECT n_nationkey, concat(n_name, '+'), n_regionkey, 1
        FROM sql_nation_src WHERE n_regionkey = 1""")
      s.sql(s"DELETE FROM $cat.db.nation_cowt WHERE n_nationkey >= 20")
      cat
    })
  }

  /** Branch (Iceberg writable ref) fixture: seed db.nation_br, create
    * branch 'wip', upsert region-2 rows ON THE BRANCH through the
    * `db.t.branch_wip` identifier (main must stay untouched — required
    * inline, so the gate pins isolation too), then CALL fast_forward to
    * land the branch's net effect on main as ONE atomic commit. */
  private[graft] def branchFixture(s: SparkSession, d: String): String = {
    // dependency hoisted outside the lambda (the cowTailFixture rationale)
    val cat = dmlFixture(s, d)
    built.computeIfAbsent(s"${System.identityHashCode(s)}:$d:branch", _ => {
      s.sql(s"DROP TABLE IF EXISTS $cat.db.nation_br")
      s.sql(s"""CREATE TABLE $cat.db.nation_br (
          n_nationkey INT, n_name STRING, n_regionkey INT, update_ts INT)
        USING graft PARTITIONED BY (n_regionkey)
        TBLPROPERTIES (keyCols='n_nationkey', precombineCol='update_ts')""")
      s.sql(s"INSERT INTO $cat.db.nation_br SELECT *, 0 FROM sql_nation_src")
      s.sql(s"CALL $cat.system.create_branch('db.nation_br', 'wip', -1)")
      s.sql(s"""INSERT INTO $cat.db.nation_br.branch_wip
        SELECT n_nationkey, concat(n_name, '+wip'), n_regionkey, 1
        FROM sql_nation_src WHERE n_regionkey = 2""")
      // isolation: the branch write must NOT be visible on main yet
      require(s.sql(s"""SELECT count(*) FROM $cat.db.nation_br
          WHERE n_name LIKE '%+wip'""").first().getLong(0) == 0L,
        "branch write leaked into main before fast_forward")
      s.sql(s"CALL $cat.system.fast_forward('db.nation_br', 'wip')")
      cat
    })
  }


  /** sumCols fixture: nation replica with per-file EXACT sums recorded
    * for (n_nationkey, val) — `val` is NULL for region 2 so the gated
    * queries pin SQL NULL-sum semantics too. The DELETE rewrites files,
    * so the gate also proves rewritten files re-record their sums. */
  private[graft] def sumFixture(s: SparkSession, d: String): String = {
    val cat = dmlFixture(s, d)
    built.computeIfAbsent(s"${System.identityHashCode(s)}:$d:sum", _ => {
      s.sql(s"DROP TABLE IF EXISTS $cat.db.nation_sum")
      s.sql(s"""CREATE TABLE $cat.db.nation_sum (
          n_nationkey INT, n_name STRING, n_regionkey INT, val INT,
          update_ts INT)
        USING graft PARTITIONED BY (n_regionkey)
        TBLPROPERTIES (keyCols='n_nationkey', precombineCol='update_ts',
          sumCols='n_nationkey,val')""")
      s.sql(s"""INSERT INTO $cat.db.nation_sum
        SELECT n_nationkey, n_name, n_regionkey,
               CASE WHEN n_regionkey = 2 THEN NULL ELSE n_nationkey * 3 END, 0
        FROM sql_nation_src""")
      s.sql(s"DELETE FROM $cat.db.nation_sum WHERE n_nationkey >= 20")
      cat
    })
  }

  /** SQL DEFAULT column values fixture (r14): a table whose tier/score/
    * update_ts carry CREATE-time defaults, filled by Spark's INSERT
    * analysis (TableCatalogCapability.SUPPORT_COLUMN_DEFAULT_VALUE) for
    * omitted columns — including on the SECOND insert, when the table
    * schema already resolves from the commit log (the overlay contract,
    * ColumnDefaultsSpec). */
  private[graft] def defaultsFixture(s: SparkSession, d: String): String = {
    val cat = dmlFixture(s, d) // registers the catalog + source view
    built.computeIfAbsent(s"${System.identityHashCode(s)}:$d:defaults", _ => {
      s.sql(s"""CREATE TABLE $cat.db.ndef (n_nationkey BIGINT,
        n_name STRING, tier STRING DEFAULT 'std', score INT DEFAULT 7,
        update_ts INT DEFAULT 0) USING graft
        TBLPROPERTIES (keyCols='n_nationkey', precombineCol='update_ts')""")
      s.sql(s"""INSERT INTO $cat.db.ndef (n_nationkey, n_name)
        SELECT n_nationkey, n_name FROM sql_nation_src
        WHERE n_nationkey < 10""")
      s.sql(s"""INSERT INTO $cat.db.ndef (n_nationkey, n_name, tier)
        SELECT n_nationkey, n_name, 'vip' FROM sql_nation_src
        WHERE n_nationkey >= 10 AND n_nationkey < 15""")
      // ALTER-time default: rows above predate the column and must
      // BACKFILL 3 at read (exists-default); the insert below omits it
      // and fills 3 forward
      s.sql(s"ALTER TABLE $cat.db.ndef ADD COLUMN bonus INT DEFAULT 3")
      s.sql(s"""INSERT INTO $cat.db.ndef (n_nationkey, n_name)
        SELECT n_nationkey, n_name FROM sql_nation_src
        WHERE n_nationkey >= 15 AND n_nationkey < 20""")
      // SET DEFAULT (r15): repoints the declaration for FUTURE inserts
      // only — every row above keeps its stored/backfilled value
      s.sql(s"ALTER TABLE $cat.db.ndef ALTER COLUMN tier SET DEFAULT 'ext'")
      s.sql(s"""INSERT INTO $cat.db.ndef (n_nationkey, n_name)
        SELECT n_nationkey, n_name FROM sql_nation_src
        WHERE n_nationkey >= 20""")
      // nested ADD COLUMN ... DEFAULT (r16): the constant backfills the
      // new field through the struct rebuild for every pre-existing row
      // whose PARENT is non-null — null parents stay null
      s.sql(s"ALTER TABLE $cat.db.ndef ADD COLUMN meta STRUCT<src: STRING>")
      s.sql(s"""UPDATE $cat.db.ndef SET meta = named_struct('src', 'seed')
        WHERE n_nationkey < 5""")
      s.sql(s"ALTER TABLE $cat.db.ndef ADD COLUMN meta.flag INT DEFAULT 4")
      cat
    })
  }

  /** SQL views fixture (r14): a column-aliased view over the DML
    * fixture's final nation state plus a view-over-view aggregate —
    * exercising parse-time DDL interception, definer-context
    * qualification, alias projection, and eager nested expansion
    * ([[graft.sql.GraftSqlParser]] / [[graft.sql.GraftViewRule]]). */
  private[graft] def viewFixture(s: SparkSession, d: String): String = {
    val cat = dmlFixture(s, d)
    built.computeIfAbsent(s"${System.identityHashCode(s)}:$d:views", _ => {
      s.sql(s"""CREATE VIEW $cat.db.nation_v (key, name, region) AS
        SELECT n_nationkey, n_name, n_regionkey FROM $cat.db.nation
        WHERE n_regionkey <= 2""")
      s.sql(s"""CREATE VIEW $cat.db.nation_v2 AS
        SELECT region, count(*) AS n, max(name) AS top_name
        FROM $cat.db.nation_v GROUP BY region""")
      cat
    })
  }

  /** SQL materialized-view fixture (r14): CREATE MATERIALIZED VIEW over
    * a lineitem-derived fact table, then move the source and refresh
    * incrementally (`CALL graft.system.refresh_mv`) — the MV must track
    * the head through the delta path, and the SAME aggregate issued
    * against the source table must transparently rewrite onto the MV
    * ([[graft.sql.GraftMvRewrite]], plan-asserted in ViewSpec). */
  private[graft] def matViewFixture(s: SparkSession, d: String): String = {
    val cat = dmlFixture(s, d)
    built.computeIfAbsent(s"${System.identityHashCode(s)}:$d:matview", _ => {
      T.lineitem(s, d).createOrReplaceTempView("mv_li_src")
      s.sql(s"""CREATE TABLE $cat.db.mv_fact (l_orderkey BIGINT,
          l_linenumber INT, l_returnflag STRING, qty100 BIGINT, update_ts INT)
        USING graft
        TBLPROPERTIES (keyCols='l_orderkey,l_linenumber', precombineCol='update_ts')""")
      // the synthetic lineitem is NOT key-unique on (okey, lnum) —
      // collapse per key with deterministic per-column max so the
      // upsert's tie-break never decides the content (oracle mirrors)
      s.sql(s"""INSERT INTO $cat.db.mv_fact
        SELECT l_orderkey, l_linenumber, max(l_returnflag),
               max(CAST(floor(l_quantity * 100) AS BIGINT)), 0
        FROM mv_li_src GROUP BY l_orderkey, l_linenumber""")
      // MV creation refreshes to the head (c0)
      s.sql(s"""CREATE MATERIALIZED VIEW $cat.db.mv_agg AS
        SELECT l_returnflag, count(*) AS n, sum(qty100) AS sum_qty100,
               min(qty100) AS min_q, max(qty100) AS max_q
        FROM $cat.db.mv_fact GROUP BY l_returnflag""")
      // filtered MV (r15): WHERE in the definition — maintenance filters
      // every delta frame, the rewrite demands the query restate it
      s.sql(s"""CREATE MATERIALIZED VIEW $cat.db.mv_agg_r AS
        SELECT l_returnflag, count(*) AS n, sum(qty100) AS sum_qty100
        FROM $cat.db.mv_fact WHERE l_linenumber <= 3 GROUP BY l_returnflag""")
      // star-schema MV (r15): fact ⋈ dim aggregate grouped by a DIM
      // column; incremental over the fact while the dim holds still
      s.sql(s"""CREATE TABLE $cat.db.mv_dim (l_returnflag STRING,
          flag_name STRING, update_ts INT) USING graft
        TBLPROPERTIES (keyCols='l_returnflag', precombineCol='update_ts')""")
      s.sql(s"""INSERT INTO $cat.db.mv_dim VALUES
        ('A', 'accepted', 0), ('N', 'neutral', 0), ('R', 'returned', 0)""")
      s.sql(s"""CREATE MATERIALIZED VIEW $cat.db.mv_agg_j AS
        SELECT d.flag_name, count(*) AS n, sum(f.qty100) AS sum_qty100
        FROM $cat.db.mv_fact f JOIN $cat.db.mv_dim d
          ON f.l_returnflag = d.l_returnflag
        GROUP BY d.flag_name""")
      // bounded-staleness MV (r16): declared maxStaleness lets the
      // rewrite serve it while the fact head is ≤ N commits past the
      // MV's applied commit — this one is created at c0 and DELIBERATELY
      // never refreshed, so queries covered only by it pin c0 values
      s.sql(s"""CREATE MATERIALIZED VIEW $cat.db.mv_agg_s
        TBLPROPERTIES (maxStaleness='10') AS
        SELECT l_linenumber, count(*) AS n, sum(qty100) AS sum_qty100
        FROM $cat.db.mv_fact GROUP BY l_linenumber""")
      // ON-keyed + LEFT OUTER dims (r16): differently-named equi keys
      // and null-extended dim columns. mv_dim2 deliberately has NO row
      // for flag 'N', so the LEFT variant maintains a null dim group.
      s.sql(s"""CREATE TABLE $cat.db.mv_dim2 (flag_id STRING,
          flag_label STRING, update_ts INT) USING graft
        TBLPROPERTIES (keyCols='flag_id', precombineCol='update_ts')""")
      s.sql(s"""INSERT INTO $cat.db.mv_dim2 VALUES
        ('A', 'accepted', 0), ('R', 'returned', 0)""")
      s.sql(s"""CREATE MATERIALIZED VIEW $cat.db.mv_agg_jo AS
        SELECT d.flag_label, count(*) AS n, sum(f.qty100) AS sum_qty100
        FROM $cat.db.mv_fact f JOIN $cat.db.mv_dim2 d
          ON f.l_returnflag = d.flag_id
        GROUP BY d.flag_label""")
      s.sql(s"""CREATE MATERIALIZED VIEW $cat.db.mv_agg_jl AS
        SELECT d.flag_label, count(*) AS n, sum(f.qty100) AS sum_qty100
        FROM $cat.db.mv_fact f LEFT JOIN $cat.db.mv_dim2 d
          ON f.l_returnflag = d.flag_id
        GROUP BY d.flag_label""")
      // WHERE + star-join in ONE definition (r17): the delta-filter and
      // dim-join maintenance paths compose; refreshed after c1 below
      s.sql(s"""CREATE MATERIALIZED VIEW $cat.db.mv_agg_jf AS
        SELECT d.flag_name, count(*) AS n, sum(f.qty100) AS sum_qty100
        FROM $cat.db.mv_fact f JOIN $cat.db.mv_dim d
          ON f.l_returnflag = d.l_returnflag
        WHERE f.l_linenumber <= 3
        GROUP BY d.flag_name""")
      // wall-clock bounded staleness (r17): a DURATION budget — created
      // at c0, never refreshed; the unapplied c1 commit is seconds old,
      // far inside '24h', so the rewrite serves the pinned c0 snapshot.
      // Two dims so only this MV covers the (flag, linenumber) grouping.
      s.sql(s"""CREATE MATERIALIZED VIEW $cat.db.mv_agg_st
        TBLPROPERTIES (maxStaleness='24h') AS
        SELECT l_returnflag, l_linenumber, count(*) AS n,
               sum(qty100) AS sum_qty100
        FROM $cat.db.mv_fact GROUP BY l_returnflag, l_linenumber""")
      // c1: upsert every R row +100 — the refreshes below must apply the
      // DELTA (changed keys only), not rebuild
      s.sql(s"""INSERT INTO $cat.db.mv_fact
        SELECT l_orderkey, l_linenumber, max(l_returnflag),
               max(CAST(floor(l_quantity * 100) AS BIGINT)) + 100, 1
        FROM mv_li_src GROUP BY l_orderkey, l_linenumber
        HAVING max(l_returnflag) = 'R'""")
      s.sql(s"CALL $cat.system.refresh_mv('db.mv_agg')").collect()
      s.sql(s"CALL $cat.system.refresh_mv('db.mv_agg_r')").collect()
      s.sql(s"CALL $cat.system.refresh_mv('db.mv_agg_j')").collect()
      s.sql(s"CALL $cat.system.refresh_mv('db.mv_agg_jo')").collect()
      s.sql(s"CALL $cat.system.refresh_mv('db.mv_agg_jl')").collect()
      s.sql(s"CALL $cat.system.refresh_mv('db.mv_agg_jf')").collect()
      cat
    })
  }

  /** CBO fixture (r14): ANALYZE both sides of a catalog join so the
    * scans serve column stats (NDV/nulls/ranges) to Catalyst, then run
    * the join with cost-based reorder enabled — the stats must steer
    * planning without ever changing results (CboStatsSpec pins that the
    * join tree actually moves; here the oracle pins the values). */
  private[graft] def cboFixture(s: SparkSession, d: String): String = {
    val cat = dmlFixture(s, d)
    built.computeIfAbsent(s"${System.identityHashCode(s)}:$d:cbo", _ => {
      T.region(s, d).createOrReplaceTempView("cbo_region_src")
      s.sql(s"""CREATE TABLE $cat.db.region_dim (r_regionkey INT,
          r_name STRING, update_ts INT) USING graft
        TBLPROPERTIES (keyCols='r_regionkey', precombineCol='update_ts')""")
      s.sql(s"""INSERT INTO $cat.db.region_dim
        SELECT r_regionkey, r_name, 0 FROM cbo_region_src""")
      s.sql(s"CALL $cat.system.analyze('db.nation')").collect()
      s.sql(s"CALL $cat.system.analyze('db.region_dim')").collect()
      cat
    })
  }

  /** GENERATED-columns fixture (r14): identity key (engine-assigned ids
    * from exclusively-claimed ranges) + a derived generated column, two
    * partial inserts. Ids are allocation-dependent, so the oracle pins
    * INVARIANTS (start/step congruence, derived values) — and because
    * the identity IS the record key, any duplicate id would collapse
    * rows and fail the oracle's row count. */
  private[graft] def identityFixture(s: SparkSession, d: String): String = {
    val cat = dmlFixture(s, d)
    built.computeIfAbsent(s"${System.identityHashCode(s)}:$d:ident", _ => {
      s.sql(s"""CREATE TABLE $cat.db.nation_id (
          pk BIGINT GENERATED ALWAYS AS IDENTITY (START WITH 1000 INCREMENT BY 2),
          n_nationkey INT, n_name STRING,
          name_tag STRING GENERATED ALWAYS AS (concat(n_name, '!')),
          update_ts INT)
        USING graft TBLPROPERTIES (keyCols='pk', precombineCol='update_ts')""")
      s.sql(s"""INSERT INTO $cat.db.nation_id (n_nationkey, n_name, update_ts)
        SELECT n_nationkey, n_name, 0 FROM sql_nation_src WHERE n_nationkey < 10""")
      s.sql(s"""INSERT INTO $cat.db.nation_id (n_nationkey, n_name, update_ts)
        SELECT n_nationkey, n_name, 0 FROM sql_nation_src WHERE n_nationkey >= 10""")
      cat
    })
  }

  val queries: Seq[GQuery] = Seq(

    // ---- SQL DEFAULT column values (r14; SET DEFAULT r15) ---------------
    // partial INSERTs (later ones against a commit-log-resolved schema)
    // must fill the declared defaults; ALTER COLUMN SET DEFAULT repoints
    // the fill for FUTURE inserts (rows >= 20) while earlier rows keep
    // their stored values — the declaration is prospective, never
    // retroactive
    GQuery("lake_sql_defaults",
      (s, d) => {
        val cat = defaultsFixture(s, d)
        s.sql(s"""SELECT n_nationkey, n_name, tier, score, update_ts, bonus,
            meta.flag AS mflag
          FROM $cat.db.ndef ORDER BY n_nationkey""")
      },
      Some("""SELECT n_nationkey, n_name,
          CASE WHEN n_nationkey BETWEEN 10 AND 14 THEN 'vip'
               WHEN n_nationkey >= 20 THEN 'ext' ELSE 'std' END AS tier,
          CAST(7 AS INT) AS score, CAST(0 AS INT) AS update_ts,
          CAST(3 AS INT) AS bonus,
          CAST(CASE WHEN n_nationkey < 5 THEN 4 END AS INT) AS mflag
        FROM nation ORDER BY n_nationkey""")),

    // ---- CREATE/INSERT/UPDATE/DELETE through spark.sql -----------------
    // ---- SQL DELETE through deletion vectors (deleteMode='dv') --------
    // the same SupportsDelete pushdown, executed as position sidecars:
    // the commit adds only dv entries and removes nothing (spec-pinned
    // in DeletionVectorSpec); the oracle sees identical delete semantics
    GQuery("lake_sql_dv_delete",
      (s, d) => {
        val cat = dvSqlFixture(s, d)
        s.sql(s"""SELECT n_nationkey, n_name, n_regionkey
          FROM $cat.db.dvnation ORDER BY n_nationkey""")
      },
      Some("""SELECT n_nationkey, n_name, n_regionkey FROM nation
        WHERE n_nationkey NOT IN (2, 7, 12, 17, 22)
        ORDER BY n_nationkey""")),

    // the DV'd snapshot through the NATIVE DSv2 batch scan (r14): live
    // position sidecars no longer demote the table off the native path —
    // DV'd files plan into row-based partitions applying the sidecars as
    // a row-index anti-filter, clean files keep vectorized decode, and
    // file pruning / exact planner stats stay on (NativeScanSpec pins the
    // plan shape; this query pins the filtered-aggregate semantics)
    GQuery("lake_sql_dv_native",
      (s, d) => {
        val cat = dvSqlFixture(s, d)
        s.sql(s"""SELECT n_regionkey, count(*) AS n, sum(n_nationkey) AS s
          FROM $cat.db.dvnation WHERE n_nationkey >= 5
          GROUP BY n_regionkey ORDER BY n_regionkey""")
      },
      Some("""SELECT n_regionkey, CAST(count(*) AS BIGINT) AS n,
          CAST(sum(n_nationkey) AS BIGINT) AS s
        FROM nation WHERE n_nationkey >= 5
          AND n_nationkey NOT IN (2, 7, 12, 17, 22)
        GROUP BY 1 ORDER BY 1""")),

    // row-level UPDATE through deletion vectors (updateMode='dv'): the
    // matched rows' positions hide behind sidecars and their updated
    // versions land as new files in the SAME commit — semantics must be
    // indistinguishable from the merge-backed rewrite
    GQuery("lake_sql_dv_update",
      (s, d) => {
        val cat = dvSqlFixture(s, d)
        s.sql(s"""SELECT n_nationkey, n_name, n_regionkey, update_ts
          FROM $cat.db.dvnation_u ORDER BY n_nationkey""")
      },
      Some("""SELECT n_nationkey,
          CASE WHEN n_regionkey = 1 THEN n_name || '*' ELSE n_name END AS n_name,
          n_regionkey,
          CAST(CASE WHEN n_regionkey = 1 THEN 3 ELSE 0 END AS INT) AS update_ts
        FROM nation ORDER BY n_nationkey""")),

    GQuery("lake_sql_dml",
      (s, d) => {
        val cat = dmlFixture(s, d)
        s.sql(s"""SELECT n_nationkey, n_name, n_regionkey, update_ts
          FROM $cat.db.nation ORDER BY n_nationkey""")
      },
      Some("""SELECT n_nationkey,
          CASE WHEN n_regionkey = 2 THEN n_name || '!' ELSE n_name END AS n_name,
          n_regionkey,
          CASE WHEN n_regionkey = 2 THEN 7 ELSE 0 END AS update_ts
        FROM nation WHERE n_nationkey < 20
        ORDER BY n_nationkey""")),


    // ---- metadata-answered SQL SUM (round 12) ---------------------------
    // per-file exact sums recorded at commit time (sumCols) let a global
    // SUM ride the same aggregate pushdown as count(*)/MIN/MAX — no data
    // file opened (SqlCatalogSpec proves it files-deleted). sum(val) over
    // region 2 is NULL (all values NULL there): the per-file non-null
    // counts carry SQL's NULL-sum semantics through the metadata path
    GQuery("lake_sql_sum_push",
      (s, d) => {
        val cat = sumFixture(s, d)
        s.sql(s"""SELECT count(*) AS n_rows, sum(n_nationkey) AS sum_key,
            sum(val) AS sum_val FROM $cat.db.nation_sum""")
      },
      Some("""SELECT CAST(count(*) AS BIGINT) AS n_rows,
          CAST(sum(n_nationkey) AS BIGINT) AS sum_key,
          CAST(sum(CASE WHEN n_regionkey = 2 THEN NULL
                        ELSE n_nationkey * 3 END) AS BIGINT) AS sum_val
        FROM nation WHERE n_nationkey < 20""")),

    // the GROUPED form: per-partition sums from the same per-file
    // metadata (tuples re-parse through the rendering cast); region 2's
    // sum_val group is NULL through the metadata path
    GQuery("lake_sql_sum_by_part",
      (s, d) => {
        val cat = sumFixture(s, d)
        s.sql(s"""SELECT n_regionkey, sum(n_nationkey) AS sum_key,
            sum(val) AS sum_val FROM $cat.db.nation_sum
          GROUP BY n_regionkey ORDER BY n_regionkey""")
      },
      Some("""SELECT n_regionkey, CAST(sum(n_nationkey) AS BIGINT) AS sum_key,
          CAST(sum(CASE WHEN n_regionkey = 2 THEN NULL
                        ELSE n_nationkey * 3 END) AS BIGINT) AS sum_val
        FROM nation WHERE n_nationkey < 20
        GROUP BY 1 ORDER BY 1""")),

    // the FILTERED form: partition-exact predicate + metadata sums;
    // sum_val is NULL here (region 2 holds only NULL vals)
    GQuery("lake_sql_sum_where",
      (s, d) => {
        val cat = sumFixture(s, d)
        s.sql(s"""SELECT sum(n_nationkey) AS sum_key, sum(val) AS sum_val
          FROM $cat.db.nation_sum WHERE n_regionkey = 2""")
      },
      Some("""SELECT CAST(sum(n_nationkey) AS BIGINT) AS sum_key,
          CAST(NULL AS BIGINT) AS sum_val
        FROM nation WHERE n_nationkey < 20 AND n_regionkey = 2""")),

    // ---- metadata-answered SQL count -----------------------------------
    // grouped count(*) over the DML table rides the DSv2 aggregate
    // pushdown (GraftScanBuilder): the per-partition counts come from the
    // commit log's footer row counts, no data file opened —
    // SqlCatalogSpec proves the metadata path, this entry puts the same
    // surface behind the DuckDB hard gate (counts must survive the
    // UPDATE/DELETE rewrites exactly)
    GQuery("lake_sql_count",
      (s, d) => {
        val cat = dmlFixture(s, d)
        s.sql(s"""SELECT n_regionkey, count(*) AS n_rows FROM $cat.db.nation
          GROUP BY n_regionkey ORDER BY n_regionkey""")
      },
      Some("""SELECT n_regionkey, CAST(count(*) AS BIGINT) AS n_rows
        FROM nation WHERE n_nationkey < 20
        GROUP BY 1 ORDER BY 1""")),

    // global count + MIN/MAX bounds of the stats column, answered from
    // the same commit-log metadata (LakeTable.metadataMinMax) — the
    // bounds must track the DELETE exactly (the rewrite re-records them)
    GQuery("lake_sql_stats_agg",
      (s, d) => {
        val cat = dmlFixture(s, d)
        s.sql(s"""SELECT count(*) AS n_rows, min(n_nationkey) AS min_key,
            max(n_nationkey) AS max_key FROM $cat.db.nation""")
      },
      Some("""SELECT CAST(count(*) AS BIGINT) AS n_rows,
          min(n_nationkey) AS min_key, max(n_nationkey) AS max_key
        FROM nation WHERE n_nationkey < 20""")),

    // the FILTERED form (round 12): a partition-equality predicate is
    // claimed fully handled when the exactness prover certifies file
    // membership == row membership, so count + bounds answer from the
    // commit log's per-file metadata of JUST the selected partition —
    // at 100 TB `count(*) WHERE region = ...` must not scan either.
    // SqlCatalogSpec proves the no-scan claim by deleting the data
    // files; this entry pins the VALUES against DuckDB's row replay.
    GQuery("lake_sql_count_where",
      (s, d) => {
        val cat = dmlFixture(s, d)
        s.sql(s"""SELECT count(*) AS n_rows, min(n_nationkey) AS min_key,
            max(n_nationkey) AS max_key
          FROM $cat.db.nation WHERE n_regionkey = 2""")
      },
      Some("""SELECT CAST(count(*) AS BIGINT) AS n_rows,
          min(n_nationkey) AS min_key, max(n_nationkey) AS max_key
        FROM nation WHERE n_nationkey < 20 AND n_regionkey = 2""")),

    // the grouped form: per-partition counts AND key bounds in one
    // metadata answer (partition tuples parse back through the same
    // cast that rendered them)
    GQuery("lake_sql_stats_by_part",
      (s, d) => {
        val cat = dmlFixture(s, d)
        s.sql(s"""SELECT n_regionkey, count(*) AS n_rows,
            min(n_nationkey) AS min_key, max(n_nationkey) AS max_key
          FROM $cat.db.nation GROUP BY n_regionkey ORDER BY n_regionkey""")
      },
      Some("""SELECT n_regionkey, CAST(count(*) AS BIGINT) AS n_rows,
          min(n_nationkey) AS min_key, max(n_nationkey) AS max_key
        FROM nation WHERE n_nationkey < 20
        GROUP BY 1 ORDER BY 1""")),

    // ---- star join through the native batch scan + runtime pruning -----
    // catalog-SQL fact-dim join: the partitioned lake table is the fact
    // side (all-base snapshot → the DSv2 NATIVE batch scan, with exact
    // commit-log statistics), the filtered dim broadcasts, and dynamic
    // partition pruning delivers the surviving r_regionkey values to
    // GraftBatchScan.filter at execution — the fact side reads ONLY the
    // partitions the dim filter leaves alive (NativeScanSpec pins the
    // file counts; this entry pins the RESULTS of that machinery under
    // the hard gate). ASIA is region 2, whose names the fixture's
    // UPDATE suffixed — so a scan that mixed snapshots or dropped the
    // runtime filter's redundancy hash-mismatches here.
    GQuery("lake_sql_dpp_join",
      (s, d) => {
        val cat = dmlFixture(s, d)
        T.region(s, d).createOrReplaceTempView("dpp_region_src")
        s.sql(s"""SELECT n.n_nationkey, n.n_name, r.r_name
          FROM $cat.db.nation n
          JOIN dpp_region_src r ON n.n_regionkey = r.r_regionkey
          WHERE r.r_name IN ('EUROPE', 'ASIA')
          ORDER BY n.n_nationkey""")
      },
      Some("""SELECT n_nationkey,
          CASE WHEN n_regionkey = 2 THEN n_name || '!' ELSE n_name END AS n_name,
          r_name
        FROM nation JOIN region ON n_regionkey = r_regionkey
        WHERE r_name IN ('EUROPE', 'ASIA') AND n_nationkey < 20
        ORDER BY n_nationkey""")),

    // ---- write-audit-publish under the hard gate -----------------------
    // the SOURCE table's snapshot after the WAP round trip: audited
    // changes (region-3 rename, key-range delete) landed on a shallow
    // clone and fast-forwarded back in ONE publish commit — a publish
    // that dropped a change, resurrected a deleted row, or mis-borrowed
    // a file hash-mismatches against the oracle's direct replay
    GQuery("lake_wap_publish",
      (s, d) => {
        val cat = wapFixture(s, d)
        s.sql(s"""SELECT n_nationkey, n_name, n_regionkey, update_ts
          FROM $cat.db.nation_wap ORDER BY n_nationkey""")
      },
      Some("""SELECT n_nationkey,
          CASE WHEN n_regionkey = 3 THEN n_name || '~' ELSE n_name END AS n_name,
          n_regionkey,
          CASE WHEN n_regionkey = 3 THEN 1 ELSE 0 END AS update_ts
        FROM nation WHERE n_nationkey < 20
        ORDER BY n_nationkey""")),

    // ---- hidden partitioning under the hard gate -----------------------
    // months(o_orderdate) layout: the range predicate prunes directories
    // to the 6 covered months (spec-pinned file counts); the VALUES are
    // what the gate checks — a transform that mis-rendered a boundary
    // month (TZ drift, off-by-one epoch-day math) drops or duplicates
    // whole months and hash-mismatches the oracle's direct replay
    // ---- transform-aware exactness: filtered COUNT on a hidden layout --
    // month-boundary-aligned bounds make file selection provably equal
    // row selection (`months` levels are contiguous source intervals),
    // so the count answers from commit-log footer counts alone — the
    // no-scan half is pinned in HiddenPartitionSpec by deleting the
    // data files; misaligned bounds and truncate/bucket levels refuse
    GQuery("lake_sql_hidden_count",
      (s, d) => {
        val cat = hiddenFixture(s, d)
        s.sql(s"""SELECT count(*) AS n_orders
          FROM $cat.db.orders_hp
          WHERE o_orderdate >= TIMESTAMP'1996-03-01 00:00:00'
            AND o_orderdate < TIMESTAMP'1996-09-01 00:00:00'""")
      },
      Some("""SELECT CAST(count(*) AS BIGINT) AS n_orders FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-03-01'
          AND o_orderdate < TIMESTAMP '1996-09-01'""")),

    GQuery("lake_sql_hidden_part",
      (s, d) => {
        val cat = hiddenFixture(s, d)
        s.sql(s"""SELECT date_format(o_orderdate, 'yyyy-MM') AS month,
            o_orderstatus, count(*) AS n_orders,
            round(sum(o_totalprice), 2) AS revenue
          FROM $cat.db.orders_hp
          WHERE o_orderdate >= TIMESTAMP'1996-03-01 00:00:00'
            AND o_orderdate < TIMESTAMP'1996-09-01 00:00:00'
          GROUP BY 1, 2 ORDER BY 1, 2""")
      },
      Some("""SELECT strftime(o_orderdate, '%Y-%m') AS month,
          o_orderstatus, CAST(count(*) AS BIGINT) AS n_orders,
          round(sum(o_totalprice), 2) AS revenue
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-03-01'
          AND o_orderdate < TIMESTAMP '1996-09-01'
        GROUP BY 1, 2 ORDER BY 1, 2""")),

    // bucket(4, o_custkey) layout, second level: a custkey IN-list keeps
    // only the buckets those keys hash into within every month (the
    // rows come back complete because bucket pruning has no false
    // negatives — a wrong bucket assignment on either side loses rows)
    GQuery("lake_sql_hidden_bucket",
      (s, d) => {
        val cat = hiddenFixture(s, d)
        s.sql(s"""SELECT o_orderkey, o_custkey, o_orderstatus,
            round(o_totalprice, 2) AS price
          FROM $cat.db.orders_hp
          WHERE o_custkey IN (7, 77, 777)
          ORDER BY o_orderkey""")
      },
      Some("""SELECT o_orderkey, o_custkey, o_orderstatus,
          round(o_totalprice, 2) AS price
        FROM orders WHERE o_custkey IN (7, 77, 777)
        ORDER BY o_orderkey""")),

    // ---- storage-partitioned join under the hard gate ------------------
    // both sides are lake tables partitioned on the join key, so with
    // key-grouped partitioning reported (SupportsReportPartitioning +
    // HasPartitionKey input groups) the join plans with NO shuffle on
    // either side — NativeScanSpec pins the zero-exchange plan shape;
    // this entry pins the joined-and-aggregated RESULTS (n_updated
    // counts the fixture's region-2 UPDATE rows, so a mis-grouped or
    // mis-keyed storage partition would change the answer, not just
    // the plan)
    GQuery("lake_sql_spj_agg",
      (s, d) => {
        val cat = spjFixture(s, d)
        s.sql(s"""SELECT r.r_name, count(*) AS n_nations,
            sum(CASE WHEN n.n_name LIKE '%!' THEN 1 ELSE 0 END) AS n_updated
          FROM $cat.db.nation n
          JOIN $cat.db.region_spj r ON n.n_regionkey = r.r_regionkey
          GROUP BY r.r_name ORDER BY r.r_name""")
      },
      Some("""SELECT r_name, CAST(count(*) AS BIGINT) AS n_nations,
          CAST(sum(CASE WHEN n_regionkey = 2 THEN 1 ELSE 0 END) AS BIGINT)
            AS n_updated
        FROM nation JOIN region ON n_regionkey = r_regionkey
        WHERE n_nationkey < 20
        GROUP BY 1 ORDER BY 1""")),

    // dynamic partition overwrite through SQL: region 2 replaced
    // wholesale (names suffixed, ts bumped), every other region's rows
    // byte-identical to the seed
    GQuery("lake_sql_dyn_overwrite",
      (s, d) => {
        val cat = dynFixture(s, d)
        s.sql(s"""SELECT n_nationkey, n_name, n_regionkey, update_ts
          FROM $cat.db.nation_dyn ORDER BY n_nationkey""")
      },
      Some("""SELECT n_nationkey,
          CASE WHEN n_regionkey = 2 THEN n_name || '_NEW'
               WHEN n_regionkey = 4 THEN n_name || '_RW'
               ELSE n_name END AS n_name,
          n_regionkey,
          CASE WHEN n_regionkey = 2 THEN 1
               WHEN n_regionkey = 4 THEN 2 ELSE 0 END AS update_ts
        FROM nation ORDER BY n_nationkey""")),

    // ---- SQL time travel: VERSION AS OF the seed commit ----------------
    // (the stale insert, update, and delete all happened after commit 0)
    GQuery("lake_sql_time_travel",
      (s, d) => {
        val cat = dmlFixture(s, d)
        s.sql(s"""SELECT n_nationkey, n_name, n_regionkey, update_ts
          FROM $cat.db.nation VERSION AS OF 0 ORDER BY n_nationkey""")
      },
      Some("""SELECT n_nationkey, n_name, n_regionkey, 0 AS update_ts
        FROM nation ORDER BY n_nationkey""")),

    // ---- named tag time travel (Iceberg tag refs) -----------------------
    // the fixture's CALL create_tag pinned the seed commit under a NAME;
    // `VERSION AS OF '<name>'` resolves it on the commit log — same rows
    // as the numeric form (lake_sql_time_travel's oracle), proving
    // name→id resolution goes through the timeline, not a cached snapshot
    GQuery("lake_sql_tag_read",
      (s, d) => {
        val cat = dmlFixture(s, d)
        s.sql(s"""SELECT n_nationkey, n_name, n_regionkey, update_ts
          FROM $cat.db.nation VERSION AS OF 'seed.v0' ORDER BY n_nationkey""")
      },
      Some("""SELECT n_nationkey, n_name, n_regionkey, 0 AS update_ts
        FROM nation ORDER BY n_nationkey""")),

    // ---- metadata tables (Iceberg db.t.<suffix> surface) -----------------
    // the commit timeline, per-partition file stats and tag refs read as
    // PLAIN SQL tables. The fixture's timeline is deterministic (c0 seed
    // insert, c1 stale insert, c2 UPDATE-as-merge, c3 delete), and the
    // partitions table's footer row sums equal the final per-region
    // counts because every live file is a CoW base file.
    GQuery("lake_sql_meta_history",
      (s, d) => {
        val cat = dmlFixture(s, d)
        s.sql(s"""SELECT commit_id, op FROM $cat.db.nation.history
          ORDER BY commit_id""")
      },
      Some("""SELECT * FROM (VALUES
          (CAST(0 AS BIGINT), 'upsert'), (CAST(1 AS BIGINT), 'upsert'),
          (CAST(2 AS BIGINT), 'merge'), (CAST(3 AS BIGINT), 'delete'))
          AS t(commit_id, op)
        ORDER BY commit_id""")),
    GQuery("lake_sql_meta_partitions",
      (s, d) => {
        val cat = dmlFixture(s, d)
        s.sql(s"""SELECT part, rows_written FROM $cat.db.nation.partitions
          ORDER BY part""")
      },
      Some("""SELECT CAST(n_regionkey AS VARCHAR) AS part,
          CAST(count(*) AS BIGINT) AS rows_written
        FROM nation WHERE n_nationkey < 20
        GROUP BY n_regionkey ORDER BY part""")),
    // ---- read-optimized MoR view (Hudi `_ro`) through SQL ---------------
    // the suffix table scans base files only: the pending region-3 delta
    // is invisible to `.ro` (oracle = the pure seed state) while the
    // snapshot read merges it (lake_mor_snapshot covers that side)
    GQuery("lake_sql_ro_read",
      (s, d) => {
        val cat = morFixture(s, d)
        s.sql(s"""SELECT n_nationkey, n_name, update_ts
          FROM $cat.db.nation_ro.ro ORDER BY n_nationkey""")
      },
      Some("""SELECT n_nationkey, n_name, 0 AS update_ts
        FROM nation ORDER BY n_nationkey""")),
    GQuery("lake_sql_meta_tags",
      (s, d) => {
        val cat = dmlFixture(s, d)
        s.sql(s"SELECT name, commit_id FROM $cat.db.nation.tags")
      },
      Some("SELECT 'seed.v0' AS name, CAST(0 AS BIGINT) AS commit_id")),

    // ---- writable branches (Iceberg branch refs) -------------------------
    // work lands on `db.t.branch_wip` (an isolated timeline borrowing the
    // seed's files zero-copy), main provably unchanged until CALL
    // fast_forward publishes the branch's net effect as one atomic commit.
    // The oracle replays the branched edit over the raw table
    GQuery("lake_sql_branch_rw",
      (s, d) => {
        val cat = branchFixture(s, d)
        s.sql(s"""SELECT n_nationkey, n_name, n_regionkey, update_ts
          FROM $cat.db.nation_br ORDER BY n_nationkey""")
      },
      Some("""SELECT n_nationkey,
          CASE WHEN n_regionkey = 2 THEN n_name || '+wip' ELSE n_name END AS n_name,
          n_regionkey,
          CASE WHEN n_regionkey = 2 THEN 1 ELSE 0 END AS update_ts
        FROM nation ORDER BY n_nationkey""")),

    // ---- streaming tail of a CATALOG table, by name ---------------------
    // same change-log semantics as lake_tail_changes, but resolved through
    // readStream.table("cat.db.t") instead of a path: only the delta
    // commits (c1 update, c2 tombstones) are the tail; the c0 base load is
    // not a change. Sort is total: one update row and/or one tombstone per
    // key, tombstones carry NULL payloads.
    GQuery("catalog_stream_tail",
      (s, d) => {
        import org.apache.spark.sql.functions.col
        val cat = tailFixture(s, d)
        val qn = "catalog_stream_tail_sink"
        val q = s.readStream.table(s"$cat.db.nation_mor")
          .writeStream.outputMode("append")
          .format("memory").queryName(qn).start()
        try q.processAllAvailable() finally q.stop()
        s.table(qn).select(col("n_nationkey"), col("n_name"),
            col("n_regionkey"), col("update_ts"), col("_deleted"))
          .orderBy(col("n_nationkey"), col("_deleted"))
      },
      Some("""WITH tail AS (
          SELECT n_nationkey, n_name || '+' AS n_name, n_regionkey,
                 1 AS update_ts, false AS _deleted
          FROM nation WHERE n_regionkey = 1
          UNION ALL
          SELECT n_nationkey, CAST(NULL AS VARCHAR) AS n_name,
                 CAST(NULL AS INT) AS n_regionkey,
                 CAST(NULL AS INT) AS update_ts, true AS _deleted
          FROM nation WHERE n_nationkey >= 20)
        SELECT * FROM tail ORDER BY n_nationkey, _deleted""")),

    // ---- zero-copy shallow clone via CALL -------------------------------
    // clone the DML fixture table at head (metadata-only: the clone's
    // commits borrow the source's files) and read the CLONE — the oracle
    // is the same final-state SQL as lake_sql_dml, so a clone that
    // missed a commit, resurrected a deleted row, or broke borrowed-file
    // schema adaptation hash-mismatches here. Re-cloned per run (drop +
    // CALL are metadata writes).
    GQuery("lake_sql_clone",
      (s, d) => {
        val cat = dmlFixture(s, d)
        s.sql(s"DROP TABLE IF EXISTS $cat.db.nation_clone")
        s.sql(s"CALL $cat.system.clone('db.nation', 'db.nation_clone', -1L)")
          .collect()
        s.sql(s"""SELECT n_nationkey, n_name, n_regionkey, update_ts
          FROM $cat.db.nation_clone ORDER BY n_nationkey""")
      },
      Some("""SELECT n_nationkey,
          CASE WHEN n_regionkey = 2 THEN n_name || '!' ELSE n_name END AS n_name,
          n_regionkey,
          CASE WHEN n_regionkey = 2 THEN 7 ELSE 0 END AS update_ts
        FROM nation WHERE n_nationkey < 20
        ORDER BY n_nationkey""")),

    // ---- streaming tail of a CoW catalog table --------------------------
    // the same timeline as catalog_stream_tail but on COPY_ON_WRITE (the
    // reference's table type): changes are DERIVED per commit from its
    // adds/removes — commit-stamp filter for upserts (rewritten-but-
    // unchanged co-located rows must NOT surface), bounded anti-join for
    // tombstones, which carry the values the keys held when deleted.
    // On CoW the c0 seed load IS a change batch (every row is new).
    GQuery("catalog_stream_tail_cow",
      (s, d) => {
        import org.apache.spark.sql.functions.col
        val cat = cowTailFixture(s, d)
        val qn = "catalog_stream_tail_cow_sink"
        val q = s.readStream.table(s"$cat.db.nation_cowt")
          .writeStream.outputMode("append")
          .format("memory").queryName(qn).start()
        try q.processAllAvailable() finally q.stop()
        s.table(qn).select(col("n_nationkey"), col("n_name"),
            col("n_regionkey"), col("update_ts"), col("_deleted"))
          .orderBy(col("n_nationkey"), col("_deleted"), col("update_ts"))
      },
      Some("""WITH tail AS (
          SELECT n_nationkey, n_name, n_regionkey,
                 0 AS update_ts, false AS _deleted
          FROM nation
          UNION ALL
          SELECT n_nationkey, n_name || '+' AS n_name, n_regionkey,
                 1 AS update_ts, false AS _deleted
          FROM nation WHERE n_regionkey = 1
          UNION ALL
          SELECT n_nationkey,
                 CASE WHEN n_regionkey = 1 THEN n_name || '+' ELSE n_name END AS n_name,
                 n_regionkey,
                 CASE WHEN n_regionkey = 1 THEN 1 ELSE 0 END AS update_ts,
                 true AS _deleted
          FROM nation WHERE n_nationkey >= 20)
        SELECT * FROM tail ORDER BY n_nationkey, _deleted, update_ts""")),

    // ---- CTAS + REPLACE TABLE AS SELECT ---------------------------------
    // materialize-a-SELECT (the reference's ETL shape: read → transform →
    // publish a table) through the staged catalog path; the oracle pins
    // the post-REPLACE snapshot
    GQuery("lake_sql_ctas",
      (s, d) => {
        val cat = ctasFixture(s, d)
        s.sql(s"""SELECT n_nationkey, n_name, n_regionkey, update_ts
          FROM $cat.db.nation_ctas ORDER BY n_nationkey""")
      },
      Some("""SELECT n_nationkey, upper(n_name) AS n_name, n_regionkey,
          1 AS update_ts
        FROM nation WHERE n_regionkey <= 2
        ORDER BY n_nationkey""")),

    // ---- MERGE with a residual ON conjunct ------------------------------
    // ON t.k = s.k AND t.n_regionkey = 1: the residual scopes the matched
    // delete/update to region 1; key-matched rows outside it stay put and
    // are NOT re-inserted (keyed table — see GraftMergeCommand scaladoc)
    GQuery("lake_sql_merge_residual",
      (s, d) => {
        val cat = residualFixture(s, d)
        s.sql(s"""SELECT n_nationkey, n_name, n_regionkey, update_ts
          FROM $cat.db.nation_res ORDER BY n_nationkey""")
      },
      Some("""SELECT n_nationkey,
          CASE WHEN n_regionkey = 1 THEN n_name || '*' ELSE n_name END AS n_name,
          n_regionkey,
          CASE WHEN n_regionkey = 1 THEN 1 ELSE 0 END AS update_ts
        FROM nation
        WHERE NOT (n_regionkey = 1 AND n_nationkey >= 20)
        ORDER BY n_nationkey""")),

    // ---- SQL MERGE INTO: same clause set as lake_merge_snapshot --------
    // (the DataFrame-built merge and the SQL-built merge must produce
    // hash-identical tables — same oracle)
    GQuery("lake_sql_merge",
      (s, d) => {
        val cat = mergeFixture(s, d)
        s.sql(s"""SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity,
            update_ts
          FROM $cat.db.li ORDER BY l_orderkey, l_linenumber""")
      },
      Some(s"""WITH ${Lake.liSqlCte},
        r AS (SELECT * FROM li WHERE l_returnflag = 'R'),
        upd AS (SELECT l_orderkey, l_linenumber,
                       l_quantity + 500 AS l_quantity FROM r),
        kept AS (
          SELECT t.l_orderkey, t.l_linenumber, t.l_returnflag,
            CASE WHEN u.l_orderkey IS NOT NULL THEN u.l_quantity
                 ELSE t.l_quantity END AS l_quantity,
            CASE WHEN u.l_orderkey IS NOT NULL THEN 1 ELSE 0 END AS update_ts
          FROM li t LEFT JOIN upd u
            ON t.l_orderkey = u.l_orderkey AND t.l_linenumber = u.l_linenumber
          WHERE NOT (u.l_orderkey IS NOT NULL AND t.l_linenumber = 1)
            AND NOT (u.l_orderkey IS NULL AND t.l_returnflag = 'N')),
        ins AS (SELECT l_orderkey + 10000000 AS l_orderkey, l_linenumber,
                       l_returnflag, l_quantity + 9000 AS l_quantity,
                       1 AS update_ts FROM r)
        SELECT * FROM kept UNION ALL SELECT * FROM ins
        ORDER BY l_orderkey, l_linenumber""")),

    // ---- SQL views (r14) -----------------------------------------------
    // parse-time DDL (Spark 4.1 has no native v2-view path), read-time
    // text expansion with column aliases over the DML fixture's final
    // nation state
    GQuery("lake_sql_view",
      (s, d) => {
        val cat = viewFixture(s, d)
        s.sql(s"SELECT key, name, region FROM $cat.db.nation_v ORDER BY key")
      },
      Some("""SELECT n_nationkey AS key,
          CASE WHEN n_regionkey = 2 THEN n_name || '!' ELSE n_name END AS name,
          n_regionkey AS region
        FROM nation WHERE n_nationkey < 20 AND n_regionkey <= 2
        ORDER BY key""")),

    // view over view: the aggregate body expands THROUGH nation_v's
    // aliased projection in one analyzer firing (eager nested expansion)
    GQuery("lake_sql_view_nested",
      (s, d) => {
        val cat = viewFixture(s, d)
        s.sql(s"SELECT region, n, top_name FROM $cat.db.nation_v2 ORDER BY region")
      },
      Some("""WITH v AS (
          SELECT n_nationkey AS key,
            CASE WHEN n_regionkey = 2 THEN n_name || '!' ELSE n_name END AS name,
            n_regionkey AS region
          FROM nation WHERE n_nationkey < 20 AND n_regionkey <= 2)
        SELECT region, CAST(count(*) AS BIGINT) AS n, max(name) AS top_name
        FROM v GROUP BY region ORDER BY region""")),

    // ---- SQL materialized view (r14) -------------------------------------
    // direct MV read after an INCREMENTAL refresh (create at c0, source
    // moves to c1, CALL refresh_mv applies the delta) — the MV table
    // must equal a direct aggregation of the source's final state
    GQuery("lake_sql_matview",
      (s, d) => {
        val cat = matViewFixture(s, d)
        s.sql(s"""SELECT l_returnflag, n, sum_qty100, min_q, max_q
          FROM $cat.db.mv_agg ORDER BY l_returnflag""")
      },
      Some("""WITH f0 AS (
          SELECT l_orderkey, l_linenumber, max(l_returnflag) AS l_returnflag,
            CAST(max(CAST(floor(l_quantity * 100) AS BIGINT)) AS BIGINT) AS q
          FROM lineitem GROUP BY l_orderkey, l_linenumber),
        f AS (
          SELECT l_returnflag,
            q + CASE WHEN l_returnflag = 'R' THEN 100 ELSE 0 END AS qty100
          FROM f0)
        SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
          CAST(sum(qty100) AS BIGINT) AS sum_qty100,
          CAST(min(qty100) AS BIGINT) AS min_q,
          CAST(max(qty100) AS BIGINT) AS max_q
        FROM f GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // the SAME aggregate issued against the SOURCE table: answered from
    // the fresh MV by the transparent rewrite (GraftMvRewrite; ViewSpec
    // pins the plan actually reads the MV) — and must hash-match the
    // direct aggregation either way, because the rewrite only fires on
    // an exactly-fresh MV
    GQuery("lake_sql_matview_rewrite",
      (s, d) => {
        val cat = matViewFixture(s, d)
        s.sql(s"""SELECT l_returnflag, count(*) AS n, sum(qty100) AS sum_qty100,
            min(qty100) AS min_q, max(qty100) AS max_q
          FROM $cat.db.mv_fact GROUP BY l_returnflag ORDER BY l_returnflag""")
      },
      Some("""WITH f0 AS (
          SELECT l_orderkey, l_linenumber, max(l_returnflag) AS l_returnflag,
            CAST(max(CAST(floor(l_quantity * 100) AS BIGINT)) AS BIGINT) AS q
          FROM lineitem GROUP BY l_orderkey, l_linenumber),
        f AS (
          SELECT l_returnflag,
            q + CASE WHEN l_returnflag = 'R' THEN 100 ELSE 0 END AS qty100
          FROM f0)
        SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
          CAST(sum(qty100) AS BIGINT) AS sum_qty100,
          CAST(min(qty100) AS BIGINT) AS min_q,
          CAST(max(qty100) AS BIGINT) AS max_q
        FROM f GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // avg() against the SOURCE, answered from the fresh MV (r15): the
    // rewrite decomposes Average into Σ sum-col / Σ non-null-count-col
    // (both maintained) — exact for integer measures, so it hash-matches
    // the direct aggregate (qty100 sums stay under 2^53: the double
    // quotient is identical bit-for-bit on every path). ViewSpec pins
    // that the plan actually reads the MV.
    GQuery("lake_sql_matview_avg",
      (s, d) => {
        val cat = matViewFixture(s, d)
        s.sql(s"""SELECT l_returnflag, avg(qty100) AS avg_q
          FROM $cat.db.mv_fact GROUP BY l_returnflag ORDER BY l_returnflag""")
      },
      Some("""WITH f0 AS (
          SELECT l_orderkey, l_linenumber, max(l_returnflag) AS l_returnflag,
            CAST(max(CAST(floor(l_quantity * 100) AS BIGINT)) AS BIGINT) AS q
          FROM lineitem GROUP BY l_orderkey, l_linenumber),
        f AS (
          SELECT l_returnflag,
            q + CASE WHEN l_returnflag = 'R' THEN 100 ELSE 0 END AS qty100
          FROM f0)
        SELECT l_returnflag, avg(qty100) AS avg_q
        FROM f GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // filtered MV (r15): the definition carries WHERE l_linenumber <= 3;
    // maintenance filtered every incremental delta frame (the c1 upsert
    // refreshed through the filter), and the rewrite fires only when the
    // query restates the predicate conjunct-for-conjunct. Values must
    // hash-match the direct filtered aggregate either way.
    GQuery("lake_sql_matview_filtered",
      (s, d) => {
        val cat = matViewFixture(s, d)
        s.sql(s"""SELECT l_returnflag, count(*) AS n, sum(qty100) AS sum_qty100
          FROM $cat.db.mv_fact WHERE l_linenumber <= 3
          GROUP BY l_returnflag ORDER BY l_returnflag""")
      },
      Some("""WITH f0 AS (
          SELECT l_orderkey, l_linenumber, max(l_returnflag) AS l_returnflag,
            CAST(max(CAST(floor(l_quantity * 100) AS BIGINT)) AS BIGINT) AS q
          FROM lineitem GROUP BY l_orderkey, l_linenumber),
        f AS (
          SELECT l_returnflag, l_linenumber,
            q + CASE WHEN l_returnflag = 'R' THEN 100 ELSE 0 END AS qty100
          FROM f0)
        SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
          CAST(sum(qty100) AS BIGINT) AS sum_qty100
        FROM f WHERE l_linenumber <= 3
        GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // star-schema MV (r15): the definition carries a fact ⋈ dim join
    // grouped by a DIM column; the c1 fact upsert refreshed INCREMENTALLY
    // through the join (the dim held still — a moved dim full-rebuilds,
    // ViewSpec/MaterializedAggSpec pin that path). The SAME join
    // aggregate issued against the BASE tables rewrites onto the MV when
    // fresh (ViewSpec pins the plan); values hash-match either way.
    GQuery("lake_sql_matview_join",
      (s, d) => {
        val cat = matViewFixture(s, d)
        s.sql(s"""SELECT d.flag_name, count(*) AS n, sum(f.qty100) AS sum_qty100
          FROM $cat.db.mv_fact f JOIN $cat.db.mv_dim d
            ON f.l_returnflag = d.l_returnflag
          GROUP BY d.flag_name ORDER BY d.flag_name""")
      },
      Some("""WITH f0 AS (
          SELECT l_orderkey, l_linenumber, max(l_returnflag) AS l_returnflag,
            CAST(max(CAST(floor(l_quantity * 100) AS BIGINT)) AS BIGINT) AS q
          FROM lineitem GROUP BY l_orderkey, l_linenumber),
        f AS (
          SELECT l_returnflag,
            q + CASE WHEN l_returnflag = 'R' THEN 100 ELSE 0 END AS qty100
          FROM f0),
        dim(l_returnflag, flag_name) AS (VALUES
          ('A', 'accepted'), ('N', 'neutral'), ('R', 'returned'))
        SELECT d.flag_name, CAST(count(*) AS BIGINT) AS n,
          CAST(sum(f.qty100) AS BIGINT) AS sum_qty100
        FROM f JOIN dim d ON f.l_returnflag = d.l_returnflag
        GROUP BY d.flag_name ORDER BY d.flag_name""")),

    // ON-keyed star-schema MV (r16): the join keys carry DIFFERENT names
    // (f.l_returnflag = d.flag_id) — the recipe persists the key pairs,
    // maintenance joins and drops the unreferenced dim key, the rewrite
    // matches the pairs order-free. Incremental through the c1 upsert;
    // values hash-match the direct join aggregate either way.
    GQuery("lake_sql_matview_join_on",
      (s, d) => {
        val cat = matViewFixture(s, d)
        s.sql(s"""SELECT d.flag_label, count(*) AS n, sum(f.qty100) AS sum_qty100
          FROM $cat.db.mv_fact f JOIN $cat.db.mv_dim2 d
            ON f.l_returnflag = d.flag_id
          GROUP BY d.flag_label ORDER BY d.flag_label""")
      },
      Some("""WITH f0 AS (
          SELECT l_orderkey, l_linenumber, max(l_returnflag) AS l_returnflag,
            CAST(max(CAST(floor(l_quantity * 100) AS BIGINT)) AS BIGINT) AS q
          FROM lineitem GROUP BY l_orderkey, l_linenumber),
        f AS (
          SELECT l_returnflag,
            q + CASE WHEN l_returnflag = 'R' THEN 100 ELSE 0 END AS qty100
          FROM f0),
        dim(flag_id, flag_label) AS (VALUES
          ('A', 'accepted'), ('R', 'returned'))
        SELECT d.flag_label, CAST(count(*) AS BIGINT) AS n,
          CAST(sum(f.qty100) AS BIGINT) AS sum_qty100
        FROM f JOIN dim d ON f.l_returnflag = d.flag_id
        GROUP BY d.flag_label ORDER BY d.flag_label""")),

    // LEFT OUTER star-schema MV (r16): flag 'N' has no dim row, so its
    // fact rows aggregate under a NULL dim label — maintained
    // incrementally like the inner form (retraction math holds while
    // the dim is frozen). NULLS FIRST pinned on both engines.
    GQuery("lake_sql_matview_join_left",
      (s, d) => {
        val cat = matViewFixture(s, d)
        s.sql(s"""SELECT d.flag_label, count(*) AS n, sum(f.qty100) AS sum_qty100
          FROM $cat.db.mv_fact f LEFT JOIN $cat.db.mv_dim2 d
            ON f.l_returnflag = d.flag_id
          GROUP BY d.flag_label ORDER BY d.flag_label NULLS FIRST""")
      },
      Some("""WITH f0 AS (
          SELECT l_orderkey, l_linenumber, max(l_returnflag) AS l_returnflag,
            CAST(max(CAST(floor(l_quantity * 100) AS BIGINT)) AS BIGINT) AS q
          FROM lineitem GROUP BY l_orderkey, l_linenumber),
        f AS (
          SELECT l_returnflag,
            q + CASE WHEN l_returnflag = 'R' THEN 100 ELSE 0 END AS qty100
          FROM f0),
        dim(flag_id, flag_label) AS (VALUES
          ('A', 'accepted'), ('R', 'returned'))
        SELECT d.flag_label, CAST(count(*) AS BIGINT) AS n,
          CAST(sum(f.qty100) AS BIGINT) AS sum_qty100
        FROM f LEFT JOIN dim d ON f.l_returnflag = d.flag_id
        GROUP BY d.flag_label ORDER BY d.flag_label NULLS FIRST""")),

    // bounded-staleness rewrite (r16): the fixture's mv_agg_s (declared
    // maxStaleness=10) was refreshed at c0 and the fact then moved to c1
    // (every R row's qty100 +100) WITHOUT a refresh — the rewrite must
    // still serve the MV, pinning the answer to the APPLIED (c0)
    // snapshot. The oracle recomputes the c0 state from raw lineitem
    // (no +100 adjustment): it passes ONLY if the stale MV actually
    // answered — a fall-through to the base scan would return c1 values
    // and hash-mismatch. The query groups by l_linenumber, which no
    // other registered MV covers.
    GQuery("lake_sql_matview_stale",
      (s, d) => {
        val cat = matViewFixture(s, d)
        s.sql(s"""SELECT l_linenumber, count(*) AS n, sum(qty100) AS sum_qty100
          FROM $cat.db.mv_fact GROUP BY l_linenumber ORDER BY l_linenumber""")
      },
      Some("""WITH f0 AS (
          SELECT l_orderkey, l_linenumber,
            CAST(max(CAST(floor(l_quantity * 100) AS BIGINT)) AS BIGINT) AS q
          FROM lineitem GROUP BY l_orderkey, l_linenumber)
        SELECT l_linenumber, CAST(count(*) AS BIGINT) AS n,
          CAST(sum(q) AS BIGINT) AS sum_qty100
        FROM f0 GROUP BY l_linenumber ORDER BY l_linenumber""")),

    // wall-clock bounded staleness (r17): mv_agg_st declares
    // maxStaleness='24h' and was never refreshed past c0; the unapplied
    // c1 commit is seconds old — far inside the window — so the rewrite
    // serves the pinned c0 snapshot. The oracle recomputes c0 (no +100):
    // it hash-matches ONLY if the time-gated rewrite actually answered;
    // a base-scan fallback would return c1 values. Only mv_agg_st
    // covers the two-dimension grouping.
    GQuery("lake_sql_matview_stale_time",
      (s, d) => {
        val cat = matViewFixture(s, d)
        s.sql(s"""SELECT l_returnflag, l_linenumber, count(*) AS n,
            sum(qty100) AS sum_qty100
          FROM $cat.db.mv_fact GROUP BY l_returnflag, l_linenumber
          ORDER BY l_returnflag, l_linenumber""")
      },
      Some("""WITH f0 AS (
          SELECT l_orderkey, l_linenumber, max(l_returnflag) AS l_returnflag,
            CAST(max(CAST(floor(l_quantity * 100) AS BIGINT)) AS BIGINT) AS q
          FROM lineitem GROUP BY l_orderkey, l_linenumber)
        SELECT l_returnflag, l_linenumber, CAST(count(*) AS BIGINT) AS n,
          CAST(sum(q) AS BIGINT) AS sum_qty100
        FROM f0 GROUP BY l_returnflag, l_linenumber
        ORDER BY l_returnflag, l_linenumber""")),

    // WHERE + star-schema join in ONE MV definition (r17): mv_agg_jf
    // bakes in `l_linenumber <= 3` AND the dim join; it was refreshed
    // after c1, so the maintenance composed the delta-filter with the
    // dim-join path. The query restates the filter conjunct-for-conjunct
    // (the rewrite's containment rule); values reflect c1 (+100 on R).
    GQuery("lake_sql_matview_join_filtered",
      (s, d) => {
        val cat = matViewFixture(s, d)
        s.sql(s"""SELECT d.flag_name, count(*) AS n, sum(f.qty100) AS sum_qty100
          FROM $cat.db.mv_fact f JOIN $cat.db.mv_dim d
            ON f.l_returnflag = d.l_returnflag
          WHERE f.l_linenumber <= 3
          GROUP BY d.flag_name ORDER BY d.flag_name""")
      },
      Some("""WITH f0 AS (
          SELECT l_orderkey, l_linenumber, max(l_returnflag) AS l_returnflag,
            CAST(max(CAST(floor(l_quantity * 100) AS BIGINT)) AS BIGINT) AS q
          FROM lineitem GROUP BY l_orderkey, l_linenumber),
        f AS (
          SELECT l_linenumber, l_returnflag,
            q + CASE WHEN l_returnflag = 'R' THEN 100 ELSE 0 END AS qty100
          FROM f0),
        dim(l_returnflag, flag_name) AS (VALUES
          ('A', 'accepted'), ('N', 'neutral'), ('R', 'returned'))
        SELECT d.flag_name, CAST(count(*) AS BIGINT) AS n,
          CAST(sum(f.qty100) AS BIGINT) AS sum_qty100
        FROM f JOIN dim d ON f.l_returnflag = d.l_returnflag
        WHERE f.l_linenumber <= 3
        GROUP BY d.flag_name ORDER BY d.flag_name""")),

    // MERGE WITH SCHEMA EVOLUTION (r15): Spark's own
    // ResolveMergeIntoSchemaEvolution computes the source's new columns
    // as TableChanges and applies them through the catalog's alterTable
    // (gated on the AUTOMATIC_SCHEMA_EVOLUTION capability) — merged rows
    // carry the minted column, pre-merge rows read null
    GQuery("lake_sql_merge_evolve",
      (s, d) => {
        val cat = dmlFixture(s, d)
        built.computeIfAbsent(s"${System.identityHashCode(s)}:$d:mergeevo", _ => {
          s.sql(s"""CREATE TABLE $cat.db.nation_sevo (n_nationkey INT,
              n_name STRING, update_ts INT) USING graft
            TBLPROPERTIES (keyCols='n_nationkey', precombineCol='update_ts')""")
          s.sql(s"""INSERT INTO $cat.db.nation_sevo
            SELECT n_nationkey, n_name, 0 FROM sql_nation_src""")
          s.sql(s"""MERGE WITH SCHEMA EVOLUTION INTO $cat.db.nation_sevo t
            USING (SELECT n_nationkey, n_name, 1 AS update_ts,
                     n_regionkey AS region_tag
                   FROM sql_nation_src WHERE n_regionkey = 1) s
            ON t.n_nationkey = s.n_nationkey
            WHEN MATCHED THEN UPDATE SET *
            WHEN NOT MATCHED THEN INSERT *""")
          cat
        })
        s.sql(s"""SELECT n_nationkey, n_name, update_ts, region_tag
          FROM $cat.db.nation_sevo ORDER BY n_nationkey""")
      },
      Some("""SELECT n_nationkey, n_name,
          CAST(CASE WHEN n_regionkey = 1 THEN 1 ELSE 0 END AS INT) AS update_ts,
          CAST(CASE WHEN n_regionkey = 1 THEN n_regionkey END AS INT) AS region_tag
        FROM nation ORDER BY n_nationkey""")),

    // OPTIMIZE / VACUUM Delta spellings (r15): parser-fallback
    // statements — OPTIMIZE folds the MoR delta stack into base files,
    // VACUUM RETAIN 0 HOURS retires pre-head snapshots and sweeps
    // orphans; the surviving state must equal the logical latest rows
    // (physical reorganization + retention can never change results)
    GQuery("lake_sql_optimize",
      (s, d) => {
        val cat = dmlFixture(s, d)
        built.computeIfAbsent(s"${System.identityHashCode(s)}:$d:optvac", _ => {
          s.sql(s"""CREATE TABLE $cat.db.nation_opt (n_nationkey INT,
              n_name STRING, n_regionkey INT, update_ts INT) USING graft
            TBLPROPERTIES (keyCols='n_nationkey', precombineCol='update_ts',
              storageType='mor')""")
          s.sql(s"""INSERT INTO $cat.db.nation_opt
            SELECT n_nationkey, n_name, n_regionkey, 0 FROM sql_nation_src""")
          s.sql(s"""INSERT INTO $cat.db.nation_opt
            SELECT n_nationkey, n_name || '+', n_regionkey, 1
            FROM sql_nation_src WHERE n_regionkey = 2""")
          s.sql(s"OPTIMIZE $cat.db.nation_opt").collect()
          s.sql(s"VACUUM $cat.db.nation_opt RETAIN 0 HOURS").collect()
          cat
        })
        s.sql(s"""SELECT n_nationkey, n_name, n_regionkey
          FROM $cat.db.nation_opt ORDER BY n_nationkey""")
      },
      Some("""SELECT n_nationkey,
          CASE WHEN n_regionkey = 2 THEN n_name || '+' ELSE n_name END AS n_name,
          n_regionkey
        FROM nation ORDER BY n_nationkey""")),

    // ---- SQL multi-table transaction (r16) -------------------------------
    // BEGIN/COMMIT/ROLLBACK through the parser fallback: a rolled-back
    // pair of INSERTs (junk keys) must leave NO trace, a committed pair
    // becomes visible atomically. The query audits BOTH tables (join
    // catches junk in txn_a via extra rows; the b_total row catches junk
    // in txn_b) — it matches the oracle only if ROLLBACK discarded
    // everything and COMMIT published everything.
    GQuery("lake_sql_txn",
      (s, d) => {
        val cat = dmlFixture(s, d)
        built.computeIfAbsent(s"${System.identityHashCode(s)}:$d:sqltxn", _ => try {
          s.sql(s"""CREATE TABLE $cat.db.txn_a (n_nationkey INT,
              n_name STRING, n_regionkey INT, update_ts INT) USING graft
            TBLPROPERTIES (keyCols='n_nationkey', precombineCol='update_ts')""")
          s.sql(s"""CREATE TABLE $cat.db.txn_b (n_regionkey INT,
              region_n BIGINT, update_ts INT) USING graft
            TBLPROPERTIES (keyCols='n_regionkey', precombineCol='update_ts')""")
          s.sql("BEGIN TRANSACTION").collect()
          s.sql(s"""INSERT INTO $cat.db.txn_a
            SELECT n_nationkey + 1000, n_name || '_junk', n_regionkey, 1
            FROM sql_nation_src""")
          s.sql(s"""INSERT INTO $cat.db.txn_b
            SELECT n_regionkey + 100, CAST(999 AS BIGINT), 1
            FROM sql_nation_src GROUP BY n_regionkey""")
          s.sql("ROLLBACK").collect()
          s.sql("BEGIN").collect()
          s.sql(s"""INSERT INTO $cat.db.txn_a
            SELECT n_nationkey, n_name, n_regionkey, 2 FROM sql_nation_src""")
          s.sql(s"""INSERT INTO $cat.db.txn_b
            SELECT n_regionkey, count(*), 2
            FROM sql_nation_src GROUP BY n_regionkey""")
          s.sql("COMMIT").collect()
          cat
        } catch {
          // a mid-fixture failure must not leave the SESSION transaction
          // open (it would silently stage every later fixture's writes)
          case e: Throwable =>
            scala.util.Try(s.sql("ROLLBACK").collect()); throw e
        })
        s.sql(s"""SELECT a.n_nationkey AS k, a.n_name AS name,
            b.region_n AS region_n
          FROM $cat.db.txn_a a JOIN $cat.db.txn_b b
            ON a.n_regionkey = b.n_regionkey
          UNION ALL
          SELECT -1 AS k, 'b_total' AS name,
            (SELECT count(*) FROM $cat.db.txn_b) AS region_n
          ORDER BY k, name""")
      },
      Some("""WITH r AS (SELECT n_regionkey, CAST(count(*) AS BIGINT) AS region_n
          FROM nation GROUP BY n_regionkey)
        SELECT n.n_nationkey AS k, n.n_name AS name, r.region_n
        FROM nation n JOIN r ON n.n_regionkey = r.n_regionkey
        UNION ALL
        SELECT -1 AS k, 'b_total' AS name,
          (SELECT CAST(count(DISTINCT n_regionkey) AS BIGINT) FROM nation) AS region_n
        ORDER BY k, name""")),

    // plan-time skew-join salting under the ORACLE gate (r17): the
    // fact's join key puts half its mass on 'HOT'; with broadcast
    // fenced the rule must re-shape to the salted join (asserted on the
    // plan — a silent fall-through to the plain shuffle cannot pass),
    // and DuckDB pins the salted execution's VALUES. The frame is
    // materialized inside the builder because the salting confs are
    // scoped to it.
    GQuery("lake_sql_skew_join",
      (s, d) => {
        val cat = dmlFixture(s, d)
        built.computeIfAbsent(s"${System.identityHashCode(s)}:$d:skewj", _ => {
          T.lineitem(s, d).createOrReplaceTempView("skew_li_src")
          s.sql(s"""CREATE TABLE $cat.db.skew_fact (pk BIGINT, k STRING,
              qty BIGINT, update_ts INT) USING graft
            TBLPROPERTIES (keyCols='pk', precombineCol='update_ts')""")
          // (l_orderkey, l_linenumber) is not unique in the synthetic
          // lineitem — aggregate per key so pk is well-defined (the
          // oracle mirrors); 'HOT' owns every even orderkey = half the rows
          s.sql(s"""INSERT INTO $cat.db.skew_fact
            SELECT l_orderkey * 10 + l_linenumber AS pk,
              CASE WHEN l_orderkey % 2 = 0 THEN 'HOT'
                   ELSE concat('k', l_orderkey % 500) END AS k,
              max(CAST(floor(l_quantity * 100) AS BIGINT)) AS qty, 0
            FROM skew_li_src GROUP BY l_orderkey, l_linenumber""")
          s.sql(s"""CREATE TABLE $cat.db.skew_dim (k STRING, w BIGINT,
              update_ts INT) USING graft
            TBLPROPERTIES (keyCols='k', precombineCol='update_ts')""")
          s.sql(s"""INSERT INTO $cat.db.skew_dim
            SELECT concat('k', id) AS k, CAST(id % 97 AS BIGINT) AS w, 0
            FROM range(0, 500)
            UNION ALL SELECT 'HOT', CAST(7 AS BIGINT), 0""")
          s.sql(s"CALL $cat.system.analyze('db.skew_fact')").collect()
          cat
        })
        val confs = Seq(
          "spark.sql.autoBroadcastJoinThreshold" -> "-1",
          "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
          "spark.graft.skewJoin.broadcastMax" -> "1",
          "spark.graft.skewJoin.minRows" -> "100")
        confs.foreach { case (k, v) => s.conf.set(k, v) }
        try {
          val df = s.sql(s"""SELECT d.k AS k, count(*) AS n,
              sum(f.qty * d.w) AS total
            FROM $cat.db.skew_fact f JOIN $cat.db.skew_dim d ON f.k = d.k
            GROUP BY d.k ORDER BY k""")
          require(df.queryExecution.optimizedPlan.collect {
            case g: org.apache.spark.sql.catalyst.plans.logical.Generate => g
          }.nonEmpty, "the skewed join must re-plan SALTED for this oracle")
          val rows = df.collect()
          import scala.jdk.CollectionConverters._
          s.createDataFrame(rows.toSeq.asJava, df.schema)
        } finally confs.foreach { case (k, _) => s.conf.unset(k) }
      },
      Some("""WITH f AS (
          SELECT CASE WHEN l_orderkey % 2 = 0 THEN 'HOT'
                      ELSE 'k' || CAST(l_orderkey % 500 AS VARCHAR) END AS k,
            CAST(max(CAST(floor(l_quantity * 100) AS BIGINT)) AS BIGINT) AS qty
          FROM lineitem GROUP BY l_orderkey, l_linenumber),
        dim AS (
          SELECT 'k' || CAST(i AS VARCHAR) AS k, CAST(i % 97 AS BIGINT) AS w
          FROM range(0, 500) t(i)
          UNION ALL SELECT 'HOT', CAST(7 AS BIGINT))
        SELECT d.k AS k, CAST(count(*) AS BIGINT) AS n,
          CAST(sum(f.qty * d.w) AS BIGINT) AS total
        FROM f JOIN dim d ON f.k = d.k
        GROUP BY d.k ORDER BY k""")),

    // transaction savepoints (r17): partial rollback INSIDE an open
    // txn — pre-savepoint staged rows survive ROLLBACK TO SAVEPOINT,
    // post-savepoint junk (including a junk row that would COLLIDE with
    // a real key) retracts, post-rollback writes stack on the restored
    // state, and COMMIT publishes exactly the survivors. The oracle
    // recomputes the surviving state from raw nation: it hash-matches
    // ONLY if the retraction removed precisely the junk.
    GQuery("lake_sql_txn_savepoint",
      (s, d) => {
        val cat = dmlFixture(s, d)
        built.computeIfAbsent(s"${System.identityHashCode(s)}:$d:sqltxnsp", _ => try {
          s.sql(s"""CREATE TABLE $cat.db.txn_sp (n_nationkey INT,
              n_name STRING, update_ts INT) USING graft
            TBLPROPERTIES (keyCols='n_nationkey', precombineCol='update_ts')""")
          s.sql("BEGIN TRANSACTION").collect()
          s.sql(s"""INSERT INTO $cat.db.txn_sp
            SELECT n_nationkey, n_name, 1 FROM sql_nation_src
            WHERE n_regionkey <= 1""")
          s.sql("SAVEPOINT sp1").collect()
          // junk: new keys AND a colliding upsert over a kept key
          s.sql(s"""INSERT INTO $cat.db.txn_sp
            SELECT n_nationkey + 500, n_name || '_junk', 2
            FROM sql_nation_src""")
          s.sql(s"""INSERT INTO $cat.db.txn_sp
            SELECT n_nationkey, '__clobbered__', 3 FROM sql_nation_src
            WHERE n_regionkey = 1""")
          s.sql("ROLLBACK TO SAVEPOINT sp1").collect()
          s.sql(s"""INSERT INTO $cat.db.txn_sp
            SELECT n_nationkey, n_name, 4 FROM sql_nation_src
            WHERE n_regionkey = 2""")
          s.sql("COMMIT").collect()
          cat
        } catch {
          case e: Throwable =>
            scala.util.Try(s.sql("ROLLBACK").collect()); throw e
        })
        s.sql(s"""SELECT n_nationkey, n_name, update_ts
          FROM $cat.db.txn_sp ORDER BY n_nationkey""")
      },
      Some("""SELECT n_nationkey, n_name,
          CAST(CASE WHEN n_regionkey = 2 THEN 4 ELSE 1 END AS INT) AS update_ts
        FROM nation WHERE n_regionkey <= 2 ORDER BY n_nationkey""")),

    // ---- CREATE TABLE ... SHALLOW CLONE (r16) -----------------------------
    // the Delta spelling of CALL graft.system.clone (which lake_sql_clone
    // covers at head): a zero-copy clone pinned to the PRE-UPDATE
    // snapshot must read exactly that state while the source moved on;
    // IF NOT EXISTS re-clone is a no-op
    GQuery("lake_sql_shallow_clone",
      (s, d) => {
        val cat = dmlFixture(s, d)
        built.computeIfAbsent(s"${System.identityHashCode(s)}:$d:sqlclone", _ => {
          s.sql(s"""CREATE TABLE $cat.db.ncl (n_nationkey INT,
              n_name STRING, update_ts INT) USING graft
            TBLPROPERTIES (keyCols='n_nationkey', precombineCol='update_ts')""")
          s.sql(s"""INSERT INTO $cat.db.ncl
            SELECT n_nationkey, n_name, 0 FROM sql_nation_src""")
          s.sql(s"""INSERT INTO $cat.db.ncl
            SELECT n_nationkey, n_name || '!', 1 FROM sql_nation_src
            WHERE n_regionkey = 1""")
          s.sql(s"""CREATE TABLE $cat.db.ncl_v0 SHALLOW CLONE $cat.db.ncl
            VERSION AS OF 0""").collect()
          // idempotent spelling: an existing target is a silent no-op
          s.sql(s"""CREATE TABLE IF NOT EXISTS $cat.db.ncl_v0
            SHALLOW CLONE $cat.db.ncl""").collect()
          cat
        })
        s.sql(s"""SELECT n_nationkey, n_name
          FROM $cat.db.ncl_v0 ORDER BY n_nationkey""")
      },
      Some("""SELECT n_nationkey, n_name FROM nation ORDER BY n_nationkey""")),

    // DEEP CLONE (r17): the clone physically OWNS its copy of the
    // pinned snapshot — proved by destroying the source's data files
    // (VACUUM RETAIN 0 after a full overwrite retires the snapshot the
    // clone was taken from) and reading the clone anyway; a SHALLOW
    // clone's borrowed files would be at the source's mercy
    GQuery("lake_sql_deep_clone",
      (s, d) => {
        val cat = dmlFixture(s, d)
        built.computeIfAbsent(s"${System.identityHashCode(s)}:$d:dclone", _ => {
          s.sql(s"""CREATE TABLE $cat.db.ndc (n_nationkey INT,
              n_name STRING, update_ts INT) USING graft
            TBLPROPERTIES (keyCols='n_nationkey', precombineCol='update_ts')""")
          s.sql(s"""INSERT INTO $cat.db.ndc
            SELECT n_nationkey, n_name, 0 FROM sql_nation_src""")
          s.sql(s"""CREATE TABLE $cat.db.ndc_deep DEEP CLONE $cat.db.ndc""")
            .collect()
          // mutate + retire the source's pre-overwrite files entirely:
          // only an OWNED copy of the original snapshot survives this
          s.sql(s"""INSERT OVERWRITE $cat.db.ndc
            SELECT n_nationkey, 'gone', 9 FROM sql_nation_src""")
          s.sql(s"VACUUM $cat.db.ndc RETAIN 0 HOURS").collect()
          cat
        })
        s.sql(s"""SELECT n_nationkey, n_name
          FROM $cat.db.ndc_deep ORDER BY n_nationkey""")
      },
      Some("""SELECT n_nationkey, n_name FROM nation ORDER BY n_nationkey""")),

    // ---- COPY INTO (r16) --------------------------------------------------
    // idempotent landing-directory loads: two staged files COPY in, a
    // re-COPY is a no-op, a later arrival COPYs alone — the final state
    // equals exactly one logical ingest of every staged row
    GQuery("lake_sql_copy_into",
      (s, d) => {
        val cat = dmlFixture(s, d)
        built.computeIfAbsent(s"${System.identityHashCode(s)}:$d:copyinto", _ => {
          val staging = java.nio.file.Files
            .createTempDirectory("graft_copy_src").toString
          s.sql("""SELECT n_nationkey, n_name, n_regionkey,
              CAST(0 AS INT) AS update_ts
            FROM sql_nation_src WHERE n_nationkey < 12""")
            .repartition(2).write.mode("overwrite").parquet(staging)
          s.sql(s"""CREATE TABLE $cat.db.ncopy (n_nationkey INT,
              n_name STRING, n_regionkey INT, update_ts INT) USING graft
            TBLPROPERTIES (keyCols='n_nationkey', precombineCol='update_ts')""")
          val first = s.sql(
            s"COPY INTO $cat.db.ncopy FROM '$staging' FILEFORMAT = PARQUET")
            .collect().head
          require(first.getLong(0) > 0, s"first COPY must load files: $first")
          // idempotence: the same directory re-COPYs as a no-op
          val again = s.sql(s"COPY INTO $cat.db.ncopy FROM '$staging'")
            .collect().head
          require(again.getLong(0) == 0 && again.getLong(1) == first.getLong(0),
            s"re-COPY must skip everything: $again")
          // a late arrival lands alone
          s.sql("""SELECT n_nationkey, n_name, n_regionkey,
              CAST(0 AS INT) AS update_ts
            FROM sql_nation_src WHERE n_nationkey >= 12""")
            .coalesce(1).write.mode("append").parquet(staging)
          val late = s.sql(s"COPY INTO $cat.db.ncopy FROM '$staging'")
            .collect().head
          require(late.getLong(0) >= 1 && late.getLong(1) >= first.getLong(0),
            s"late arrival must load alone: $late")
          cat
        })
        s.sql(s"""SELECT n_nationkey, n_name, n_regionkey
          FROM $cat.db.ncopy ORDER BY n_nationkey""")
      },
      Some("""SELECT n_nationkey, n_name, n_regionkey
        FROM nation ORDER BY n_nationkey""")),

    // ---- ANALYZE + cost-based join (r14) --------------------------------
    // both scans serve analyzed column stats (NDV/nulls/ranges) through
    // DSv2 columnStats; the join plans under spark.sql.cbo.enabled with
    // join reorder on (plan forced while the flag holds — conf is
    // restored after). Stats may only STEER the plan: the oracle pins
    // that values are untouched.
    GQuery("lake_sql_cbo_join",
      (s, d) => {
        val cat = cboFixture(s, d)
        s.conf.set("spark.sql.cbo.enabled", "true")
        s.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
        try {
          val df = s.sql(s"""SELECT n.n_nationkey,
              n.n_name, r.r_name
            FROM $cat.db.nation n
            JOIN $cat.db.region_dim r ON n.n_regionkey = r.r_regionkey
            ORDER BY n.n_nationkey""")
          df.queryExecution.optimizedPlan // force planning under CBO
          df
        } finally {
          s.conf.unset("spark.sql.cbo.enabled")
          s.conf.unset("spark.sql.cbo.joinReorder.enabled")
        }
      },
      Some("""SELECT n.n_nationkey,
          CASE WHEN n.n_regionkey = 2 THEN n.n_name || '!' ELSE n.n_name END AS n_name,
          r.r_name
        FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
        WHERE n.n_nationkey < 20
        ORDER BY n.n_nationkey""")),

    // ---- GENERATED columns (r14) ----------------------------------------
    // identity ids are allocation-dependent (exclusive ranges, gaps
    // allowed — Delta's contract), so the oracle checks the START/STEP
    // congruence per row instead of values; the generated column is
    // deterministic and compared directly. Full nation row count proves
    // id uniqueness: pk is the record key, a collision collapses rows.
    // ---- ANSI constraint DDL (r14) ---------------------------------------
    // PRIMARY KEY declares the record key (no keyCols property), CHECK
    // becomes an enforced per-write predicate riding checkMode='drop' —
    // violating rows are quarantined at the ingest boundary, so the
    // final state is the filtered seed (deterministic oracle)
    GQuery("lake_sql_constraints",
      (s, d) => {
        val cat = dmlFixture(s, d)
        built.computeIfAbsent(s"${System.identityHashCode(s)}:$d:cons", _ => {
          s.sql(s"""CREATE TABLE $cat.db.nation_cons (
              n_nationkey INT, n_name STRING, n_regionkey INT, update_ts INT,
              CONSTRAINT nation_pk PRIMARY KEY (n_nationkey),
              CONSTRAINT small_key CHECK (n_nationkey < 15))
            USING graft
            TBLPROPERTIES (precombineCol='update_ts', checkMode='drop')""")
          s.sql(s"""INSERT INTO $cat.db.nation_cons
            SELECT n_nationkey, n_name, n_regionkey, 0 FROM sql_nation_src""")
          cat
        })
        s.sql(s"""SELECT n_nationkey, n_name, n_regionkey
          FROM $cat.db.nation_cons ORDER BY n_nationkey""")
      },
      Some("""SELECT n_nationkey, n_name, n_regionkey
        FROM nation WHERE n_nationkey < 15 ORDER BY n_nationkey""")),

    GQuery("lake_sql_identity",
      (s, d) => {
        val cat = identityFixture(s, d)
        s.sql(s"""SELECT n_nationkey, n_name, name_tag,
            CAST(pk >= 1000 AND (pk - 1000) % 2 = 0 AS INT) AS id_ok
          FROM $cat.db.nation_id ORDER BY n_nationkey""")
      },
      Some("""SELECT n_nationkey, n_name, n_name || '!' AS name_tag,
          1 AS id_ok
        FROM nation ORDER BY n_nationkey"""))
  )
}
