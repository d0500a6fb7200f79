package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.lake.{LakeTable, LakeTableConfig, MaterializedAgg}

/** Incremental-maintenance laws: after every refresh the aggregate must
  * equal a direct aggregation of the source snapshot; refresh is
  * idempotent per commit; emptied dimensions disappear; the applied
  * watermark ADVANCES (a frozen watermark re-applies deltas — the
  * failure mode is a silently inflated sum, caught here by the step
  * equality).
  */
class MaterializedAggSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def tmp() = Files.createTempDirectory("magg").toString

  private def df(rows: (Long, String, Long, Int)*): DataFrame = {
    import spark.implicits._
    rows.toDF("pk", "dim", "v", "ts")
  }

  private def direct(t: LakeTable): Set[(String, Long, Long)] = {
    import spark.implicits._
    t.read().groupBy($"dim")
      .agg(count(lit(1)).as("n_rows"), sum($"v").as("v_sum"))
      .as[(String, Long, Long)].collect().toSet
  }

  private def got(m: MaterializedAgg): Set[(String, Long, Long)] = {
    import spark.implicits._
    m.read().as[(String, Long, Long)].collect().toSet
  }

  test("dim-join aggregate: fact-incremental refresh equals direct; dim move rebuilds") {
    import spark.implicits._
    val fact = LakeTable(spark, LakeTableConfig(
      tmp() + "/fact", keyCols = Seq("pk"), precombineCol = "ts"))
    val dim = LakeTable(spark, LakeTableConfig(
      tmp() + "/dim", keyCols = Seq("k"), precombineCol = "ts"))
    dim.bulkInsert(Seq((1, "a", 0), (2, "b", 0)).toDF("k", "grp", "ts"))
    fact.bulkInsert(Seq((1L, 1, 10L, 0), (2L, 1, 5L, 0), (3L, 2, 7L, 0),
      (4L, 9, 99L, 0)).toDF("pk", "k", "v", "ts")) // k=9: no dim row
    val m = new MaterializedAgg(spark, fact, tmp() + "/agg",
      dims = Seq("grp"), sums = Map("v_sum" -> "v"),
      dimJoins = Seq(graft.lake.DimSide.using(dim, Seq("k"))))
    def directJoin(): Set[(String, Long, Long)] =
      fact.read().join(dim.read().select("k", "grp"), Seq("k"), "inner")
        .groupBy($"grp")
        .agg(count(lit(1)).as("n_rows"), sum($"v").as("v_sum"))
        .as[(String, Long, Long)].collect().toSet
    m.refresh()
    assert(got(m) == directJoin() && got(m) == Set(("a", 2L, 15L), ("b", 1L, 7L)))
    assert(m.fresh)

    // fact-only changes refresh INCREMENTALLY and stay law-equal
    fact.upsert(Seq((1L, 2, 20L, 1), (5L, 2, 3L, 1)).toDF("pk", "k", "v", "ts"))
    assert(!m.fresh)
    m.refresh()
    assert(got(m) == directJoin() && got(m) == Set(("a", 1L, 5L), ("b", 3L, 30L)))
    assert(m.fresh)

    // a dim move is detected and triggers a FULL rebuild (values track
    // the new dim rows; the old contributions are replaced, not patched)
    dim.upsert(Seq((1, "a2", 1), (9, "c", 1)).toDF("k", "grp", "ts"))
    assert(!m.fresh, "a moved dim must mark the aggregate stale")
    m.refresh()
    assert(got(m) == directJoin() &&
      got(m) == Set(("a2", 1L, 5L), ("b", 3L, 30L), ("c", 1L, 99L)))
    assert(m.fresh)
    // idempotent: nothing moved, refresh is a no-op and stays fresh
    m.refresh()
    assert(got(m) == directJoin())
  }

  test("ON-keyed and LEFT OUTER dim joins: incremental equals direct, null-extension kept") {
    import spark.implicits._
    val fact = LakeTable(spark, LakeTableConfig(
      tmp() + "/fact", keyCols = Seq("pk"), precombineCol = "ts"))
    val dim = LakeTable(spark, LakeTableConfig(
      tmp() + "/dim", keyCols = Seq("id"), precombineCol = "ts"))
    dim.bulkInsert(Seq((1, "a", 0), (2, "b", 0)).toDF("id", "grp", "ts"))
    // k=9 has NO dim row: inner drops it, left null-extends it
    fact.bulkInsert(Seq((1L, 1, 10L, 0), (2L, 1, 5L, 0), (3L, 2, 7L, 0),
      (4L, 9, 99L, 0)).toDF("pk", "k", "v", "ts"))
    def directJoin(jt: String): Set[(String, Long, Long)] =
      fact.read().as("f")
        .join(dim.read().select("id", "grp").as("d"), $"f.k" === $"d.id", jt)
        .groupBy($"grp")
        .agg(count(lit(1)).as("n_rows"), sum($"v").as("v_sum"))
        .as[(String, Long, Long)].collect().toSet
    val inner = new MaterializedAgg(spark, fact, tmp() + "/agg_i",
      dims = Seq("grp"), sums = Map("v_sum" -> "v"),
      dimJoins = Seq(graft.lake.DimSide(dim, Seq("k"), Seq("id"))))
    val left = new MaterializedAgg(spark, fact, tmp() + "/agg_l",
      dims = Seq("grp"), sums = Map("v_sum" -> "v"),
      dimJoins = Seq(graft.lake.DimSide(dim, Seq("k"), Seq("id"),
        leftOuter = true)))
    inner.refresh(); left.refresh()
    assert(got(inner) == directJoin("inner") &&
      got(inner) == Set(("a", 2L, 15L), ("b", 1L, 7L)))
    assert(got(left) == directJoin("left_outer"),
      "LEFT must null-extend the unmatched fact row")
    assert(got(left).exists(r => r._1 == null && r._2 == 1L && r._3 == 99L))

    // fact-only movement refreshes INCREMENTALLY through both shapes:
    // an update that flips a row's dim membership AND a brand-new
    // unmatched row (exercises null-group retraction/accumulation)
    fact.upsert(Seq((1L, 2, 20L, 1), (5L, 8, 3L, 1)).toDF("pk", "k", "v", "ts"))
    inner.refresh(); left.refresh()
    assert(got(inner) == directJoin("inner"))
    assert(got(left) == directJoin("left_outer"))
    assert(inner.fresh && left.fresh)

    // a dim move still forces the full rebuild (same law as USING joins)
    dim.upsert(Seq((9, "c", 1)).toDF("id", "grp", "ts"))
    assert(!inner.fresh && !left.fresh)
    inner.refresh(); left.refresh()
    assert(got(inner) == directJoin("inner"))
    assert(got(left) == directJoin("left_outer"))
  }

  test("aggregate equals direct recomputation after every refresh step") {
    val t = LakeTable(spark, LakeTableConfig(
      tmp() + "/src", keyCols = Seq("pk"), precombineCol = "ts"))
    val m = new MaterializedAgg(spark, t, tmp() + "/agg",
      dims = Seq("dim"), sums = Map("v_sum" -> "v"))

    t.bulkInsert(df((1L, "a", 10, 0), (2L, "a", 5, 0), (3L, "b", 7, 0)))
    m.refresh()
    assert(got(m) == direct(t) && m.applied.contains(0L))

    // update (a: 10→20), insert (c), another insert into a
    t.upsert(df((1L, "a", 20, 1), (4L, "c", 2, 1), (5L, "a", 1, 1)))
    m.refresh()
    assert(got(m) == direct(t), "after update+inserts")
    assert(m.applied.contains(1L), "watermark must advance past the first refresh")

    // stale upsert: source unchanged, delta must be zero
    t.upsert(df((1L, "a", 999, 0)))
    m.refresh()
    assert(got(m) == direct(t), "stale batch must not move the aggregate")

    // delete the whole 'b' dimension — its row must disappear
    t.delete(df((3L, "b", 7, 0)).select("pk"))
    m.refresh()
    assert(got(m) == direct(t), "after delete")
    assert(!got(m).exists(_._1 == "b"), "emptied dimension must vanish")

    // re-refresh at the same head: no-op, no new agg commits
    val commits = m.table.log.commits.size
    m.refresh()
    assert(m.table.log.commits.size == commits)
    assert(got(m) == direct(t))
  }

  test("null dimension values accumulate correctly across refreshes") {
    import spark.implicits._
    val t = LakeTable(spark, LakeTableConfig(
      tmp() + "/src", keyCols = Seq("pk"), precombineCol = "ts"))
    val rows0 = Seq((1L, Option.empty[String], 10L, 0),
      (2L, Some("a"), 5L, 0), (3L, Option.empty[String], 2L, 0))
    t.bulkInsert(rows0.toDF("pk", "dim", "v", "ts"))
    val m = new MaterializedAgg(spark, t, tmp() + "/agg",
      dims = Seq("dim"), sums = Map("v_sum" -> "v"))
    m.refresh()
    // null-dim group must exist with BOTH rows aggregated
    def nullRow = m.read().filter($"dim".isNull)
      .select($"n_rows", $"v_sum").as[(Long, Long)].collect().toSeq
    assert(nullRow == Seq((2L, 12L)))
    // incremental add into the null group must ACCUMULATE, not replace
    t.upsert(Seq((4L, Option.empty[String], 100L, 1)).toDF("pk", "dim", "v", "ts"))
    m.refresh()
    assert(nullRow == Seq((3L, 112L)),
      "null-dim delta must merge into the existing group")
    assert(got(m) == direct(t))
  }

  test("pre-upgrade aggregate without non-null-count columns rebuilds once, then increments") {
    import spark.implicits._
    val t = LakeTable(spark, LakeTableConfig(
      tmp() + "/src", keyCols = Seq("pk"), precombineCol = "ts"))
    t.bulkInsert(df((1L, "a", 10, 0), (2L, "a", 5, 0), (3L, "b", 7, 0)))
    // simulate an MV built BEFORE per-sum non-null counts existed: the
    // aggregate table carries (dim, n_rows, v_sum, _src_commit) only —
    // today's incremental merge assigns __nn_v_sum, which mergeOnce
    // would refuse against this schema
    val aggRoot = tmp() + "/agg"
    val legacy = LakeTable(spark, LakeTableConfig(
      aggRoot, keyCols = Seq("dim"), precombineCol = "_src_commit"))
    legacy.bulkInsert(t.read().groupBy($"dim")
      .agg(count(lit(1)).as("n_rows"), sum($"v").as("v_sum"))
      .withColumn("_src_commit", lit(0L)))
    val m = new MaterializedAgg(spark, t, aggRoot,
      dims = Seq("dim"), sums = Map("v_sum" -> "v"))
    assert(m.applied.contains(0L))
    // the source moves: refresh must not throw — it detects the missing
    // columns and full-rebuilds (minting them), instead of failing every
    // future refresh of a pre-upgrade MV
    t.upsert(df((1L, "a", 20, 1), (4L, "c", 2, 1)))
    m.refresh()
    assert(got(m) == direct(t), "post-upgrade rebuild")
    assert(m.table.read().columns.contains(MaterializedAgg.nnCol("v_sum")),
      "the rebuild must mint the non-null-count columns")
    // and the NEXT refresh takes the ordinary incremental merge
    t.upsert(df((5L, "b", 3, 2)))
    m.refresh()
    assert(got(m) == direct(t), "incremental after upgrade")
    assert(m.applied.contains(2L))
  }

  test("recovery survives a delete-only refresh whose marker write was lost") {
    // ADVICE r4 scenario: a refresh fully deletes a dimension's agg row;
    // the marker file is lost to a crash. Recovery must NOT regress
    // `applied` (row-level max(_src_commit) cannot see a delete-only
    // window) — otherwise the widened replay nets a negative delta for
    // fresh inserts into that dimension and they silently vanish.
    val t = LakeTable(spark, LakeTableConfig(
      tmp() + "/src", keyCols = Seq("pk"), precombineCol = "ts"))
    val aggRoot = tmp() + "/agg"
    t.bulkInsert(df((1L, "a", 10, 0), (2L, "b", 7, 0)))
    val m = new MaterializedAgg(spark, t, aggRoot,
      dims = Seq("dim"), sums = Map("v_sum" -> "v"))
    m.refresh() // applied = 0
    // commit 1: delete the ONLY 'b' row → delete-only refresh for dim b
    t.delete(df((2L, "b", 7, 0)).select("pk"))
    m.refresh() // applied = 1, agg commit is delete-only for dim b
    // simulate the crash: wipe every marker file (the merge commit with
    // its stamped metadata already published)
    val fs = new org.apache.hadoop.fs.Path(aggRoot)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(new org.apache.hadoop.fs.Path(aggRoot, "_log")).toSeq
      .filter(_.getPath.getName.startsWith("applied-"))
      .foreach(s => fs.delete(s.getPath, false))
    // a FRESH instance (no in-memory state) must still see applied = 1
    val m2 = new MaterializedAgg(spark, t, aggRoot,
      dims = Seq("dim"), sums = Map("v_sum" -> "v"))
    assert(m2.applied.contains(1L),
      "applied watermark must recover from commit metadata, not row data")
    // commit 2: NEW rows into the deleted dimension — the widened replay
    // must land them, not net them away
    t.upsert(df((5L, "b", 100, 2), (6L, "b", 1, 2)))
    m2.refresh()
    assert(got(m2) == direct(t), "fresh inserts into the deleted dim must survive")
    assert(got(m2).exists(_._1 == "b"))
  }

  test("step-by-step refresh equals one big refresh") {
    val t = LakeTable(spark, LakeTableConfig(
      tmp() + "/src", keyCols = Seq("pk"), precombineCol = "ts"))
    t.bulkInsert(df((1L, "a", 10, 0), (2L, "b", 3, 0)))
    t.upsert(df((1L, "a", 15, 1), (3L, "b", 4, 1)))
    t.delete(df((2L, "b", 3, 0)).select("pk"))

    val stepped = new MaterializedAgg(spark, t, tmp() + "/agg1",
      dims = Seq("dim"), sums = Map("v_sum" -> "v"))
    (0L to 2L).foreach(i => stepped.refresh(Some(i)))

    val oneShot = new MaterializedAgg(spark, t, tmp() + "/agg2",
      dims = Seq("dim"), sums = Map("v_sum" -> "v"))
    oneShot.refresh()

    assert(got(stepped) == got(oneShot) && got(stepped) == direct(t))
  }

  // ---- non-invertible min/max measures (VERDICT r4 item #7) ----------

  private def directMM(t: LakeTable): Set[(String, Long, Long, Long, Long)] = {
    import spark.implicits._
    t.read().groupBy($"dim")
      .agg(count(lit(1)).as("n_rows"), sum($"v").as("v_sum"),
        min($"v").as("v_min"), max($"v").as("v_max"))
      .as[(String, Long, Long, Long, Long)].collect().toSet
  }

  private def gotMM(m: MaterializedAgg): Set[(String, Long, Long, Long, Long)] = {
    import spark.implicits._
    m.read().as[(String, Long, Long, Long, Long)].collect().toSet
  }

  private def mmAgg(t: LakeTable, root: String) =
    new MaterializedAgg(spark, t, root, dims = Seq("dim"),
      sums = Map("v_sum" -> "v"),
      mins = Map("v_min" -> "v"), maxs = Map("v_max" -> "v"))

  test("min/max track deletes of the extreme row (targeted recompute)") {
    val t = LakeTable(spark, LakeTableConfig(
      tmp() + "/src", keyCols = Seq("pk"), precombineCol = "ts"))
    val m = mmAgg(t, tmp() + "/agg")
    t.bulkInsert(df((1L, "a", 10, 0), (2L, "a", 5, 0), (3L, "a", 70, 0),
      (4L, "b", 1, 0)))
    m.refresh()
    assert(gotMM(m) == directMM(t))
    // delete the current MIN of 'a' — subtracting can't undo a min;
    // only a recompute over the affected dim gives 10
    t.delete(df((2L, "a", 5, 0)).select("pk"))
    m.refresh()
    assert(gotMM(m) == directMM(t), "min must rise after deleting the min row")
    // delete the current MAX of 'a'
    t.delete(df((3L, "a", 70, 0)).select("pk"))
    m.refresh()
    assert(gotMM(m) == directMM(t), "max must fall after deleting the max row")
  }

  test("zero-count-delta update still moves the order statistics") {
    val t = LakeTable(spark, LakeTableConfig(
      tmp() + "/src", keyCols = Seq("pk"), precombineCol = "ts"))
    val m = mmAgg(t, tmp() + "/agg")
    t.bulkInsert(df((1L, "a", 10, 0), (2L, "a", 50, 0)))
    m.refresh()
    // in-place update: count delta for 'a' is ZERO, sum moves, and the
    // max moves DOWN (50 -> 20) — a delta-only maintainer that filters
    // zero-count dims would freeze the max at 50
    t.upsert(df((2L, "a", 20, 1)))
    m.refresh()
    assert(gotMM(m) == directMM(t), "in-place update must refresh min/max")
    // and an update that only changes the MIN, leaving sum-of-others
    t.upsert(df((1L, "a", 30, 2)))
    m.refresh()
    assert(gotMM(m) == directMM(t))
  }

  test("untouched dimensions are not recomputed or rewritten") {
    val t = LakeTable(spark, LakeTableConfig(
      tmp() + "/src", keyCols = Seq("pk"), precombineCol = "ts"))
    val m = mmAgg(t, tmp() + "/agg")
    t.bulkInsert(df((1L, "a", 10, 0), (2L, "b", 5, 0), (3L, "c", 7, 0)))
    m.refresh()
    val before = {
      import spark.implicits._
      m.table.read().filter($"dim" =!= "a")
        .select($"dim", $"_src_commit").as[(String, Long)].collect().toSet
    }
    t.upsert(df((1L, "a", 99, 1))) // touches ONLY dim a
    m.refresh()
    assert(gotMM(m) == directMM(t))
    val after = {
      import spark.implicits._
      m.table.read().filter($"dim" =!= "a")
        .select($"dim", $"_src_commit").as[(String, Long)].collect().toSet
    }
    assert(after == before,
      "dimensions outside the change window must keep their version stamp")
  }

  test("min/max: stepped equals one-shot equals direct, with dim churn") {
    val t = LakeTable(spark, LakeTableConfig(
      tmp() + "/src", keyCols = Seq("pk"), precombineCol = "ts"))
    t.bulkInsert(df((1L, "a", 10, 0), (2L, "b", 3, 0)))
    t.upsert(df((3L, "b", -4, 1), (4L, "c", 8, 1)))   // new min for b, new dim
    t.delete(df((2L, "b", 3, 0)).select("pk"))        // b keeps only -4
    t.upsert(df((1L, "a", 2, 2)))                     // a's single row moves
    val stepped = mmAgg(t, tmp() + "/agg1")
    (0L to 3L).foreach(i => stepped.refresh(Some(i)))
    val oneShot = mmAgg(t, tmp() + "/agg2")
    oneShot.refresh()
    assert(gotMM(stepped) == gotMM(oneShot) && gotMM(stepped) == directMM(t))
  }

  test("CoW refresh takes the window-bounded path; MoR falls back — both exact") {
    // partitioned CoW: the fast path must engage (adds/subs read only
    // the window's touched file groups) and match the direct aggregate
    val t = LakeTable(spark, LakeTableConfig(
      tmp() + "/src", keyCols = Seq("pk"), precombineCol = "ts",
      partitionCols = Seq("dim")))
    val m = new MaterializedAgg(spark, t, tmp() + "/agg",
      dims = Seq("dim"), sums = Map("v_sum" -> "v"))
    t.bulkInsert(df((1L, "a", 10, 0), (2L, "a", 5, 0), (3L, "b", 7, 0)))
    m.refresh()
    // update a, insert c, delete ALL of b (partition drop is a
    // remove-only commit — gone-keys must come from the removed files)
    t.upsert(df((1L, "a", 20, 1), (4L, "c", 2, 1)))
    t.delete(df((3L, "b", 7, 0)).select("pk"))
    m.refresh()
    assert(m.lastRefreshBounded, "partitioned CoW window must take the bounded path")
    assert(got(m) == direct(t))
    assert(!got(m).exists(_._1 == "b"))

    // MoR: delta files in the window → fallback, result still exact
    val tm = LakeTable(spark, LakeTableConfig(
      tmp() + "/srcm", keyCols = Seq("pk"), precombineCol = "ts",
      storageType = "mor"))
    val mm = new MaterializedAgg(spark, tm, tmp() + "/aggm",
      dims = Seq("dim"), sums = Map("v_sum" -> "v"))
    tm.bulkInsert(df((1L, "a", 10, 0), (2L, "b", 5, 0)))
    mm.refresh()
    tm.upsert(df((1L, "a", 30, 1), (3L, "b", 4, 1)))
    mm.refresh()
    assert(!mm.lastRefreshBounded, "MoR delta window must use the snapshot fallback")
    assert(got(mm) == direct(tm))
  }
}
