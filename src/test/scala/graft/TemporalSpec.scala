package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** AS-OF / range join semantics pinned against brute-force theta-joins on
  * handcrafted frames (match choice, inclusivity, left-outer nulls,
  * direction, tolerance), plus executed-plan assertions that neither
  * operator ever degenerates to a nested-loop/cartesian join — the whole
  * point of their existence (SURVEY.md §7.3 compose-first rule).
  */
class TemporalSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def trades = Seq(
    // (key, time, trade id)
    ("a", 10L, 1L), ("a", 20L, 2L), ("a", 30L, 3L),
    ("b", 15L, 4L),
    ("c", 5L, 5L) // key with no quotes at all
  ).toDF("sym", "t_ms", "trade_id")

  private def quotes = Seq(
    // (key, time, price) — includes an exact-tie time (a, 20)
    ("a", 8L, 1.0), ("a", 20L, 2.0), ("a", 25L, 3.0),
    ("b", 999L, 9.0) // only a FUTURE quote for b
  ).toDF("sym", "q_ms", "px")

  test("asof backward: latest at-or-before match per key, nulls when none") {
    val out = ops.Temporal.asofJoin(trades, quotes, Seq("sym"), "t_ms", "q_ms")
      .select("sym", "t_ms", "q_ms", "px").collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (Option(r.get(2)), Option(r.get(3)))).toMap
    assert(out(("a", 10L)) == (Some(8L), Some(1.0)))
    assert(out(("a", 20L)) == (Some(20L), Some(2.0)), "equal time matches (inclusive)")
    assert(out(("a", 30L)) == (Some(25L), Some(3.0)))
    assert(out(("b", 15L)) == (None, None), "future-only quotes never match backward")
    assert(out(("c", 5L)) == (None, None), "keys with no right rows keep nulls")
    assert(out.size == 5, "every left row survives exactly once")
  }

  test("asof forward: earliest at-or-after match per key") {
    val out = ops.Temporal.asofJoin(trades, quotes, Seq("sym"), "t_ms", "q_ms",
      direction = "forward")
      .select("sym", "t_ms", "q_ms").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> Option(r.get(2))).toMap
    assert(out(("a", 10L)) == Some(20L))
    assert(out(("a", 20L)) == Some(20L))
    assert(out(("a", 30L)) == None)
    assert(out(("b", 15L)) == Some(999L))
  }

  test("asof tolerance: stale matches null out") {
    val out = ops.Temporal.asofJoin(trades, quotes, Seq("sym"), "t_ms", "q_ms",
      tolerance = Some(3L))
      .select("sym", "t_ms", "q_ms").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> Option(r.get(2))).toMap
    assert(out(("a", 10L)) == Some(8L), "within tolerance")
    assert(out(("a", 30L)) == None, "30-25 > 3 nulls out")
    assert(out(("a", 20L)) == Some(20L), "distance 0 always passes")
  }

  test("asof matches a brute-force window theta-join on the fixture") {
    val sf = "/root/testdata/sf0.001"
    val got = SparkEntry.queries("ev_asof_attribution")(spark, sf)
      .select("event_id", "click_ms", "click_id").collect()
      .map(r => r.getLong(0) -> (Option(r.get(1)), Option(r.get(2)))).toMap
    // brute force: per purchase, max click_ms <= t_ms, then the dedup'd
    // click row at that time
    val ev = Tables.events(spark, sf)
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), unix_millis(col("ts")).as("t_ms"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("cu"), unix_millis(col("ts")).as("click_ms"),
        col("event_id").as("click_id"))
      .groupBy(col("cu"), col("click_ms")).agg(max("click_id").as("click_id"))
    val brute = p.join(c, p("user_id") === c("cu") && col("click_ms") <= col("t_ms"),
        "left_outer")
      .groupBy(col("event_id"))
      .agg(max(col("click_ms")).as("bm"),
        max_by(col("click_id"), col("click_ms")).as("bid"))
      .collect().map(r => r.getLong(0) -> (Option(r.get(1)), Option(r.get(2)))).toMap
    assert(got.keySet == brute.keySet)
    got.foreach { case (id, (ms, cid)) =>
      assert((ms, cid) == brute(id), s"purchase $id")
    }
    assert(got.values.exists(_._1.isDefined), "fixture should attribute some purchases")
  }

  test("range join: equals the naive inequality join, bounds inclusive") {
    val points = Seq((1L, 0L), (2L, 10L), (3L, 19L), (4L, 20L), (5L, 21L),
      (6L, 55L), (7L, -7L)).toDF("pid", "x")
    val ivs = Seq((100L, 10L, 20L), (101L, 15L, 40L), (102L, -10L, -5L),
      (103L, 60L, 70L)).toDF("iid", "lo", "hi")
    val got = ops.Temporal.rangeJoin(points, "x", ivs, "lo", "hi", bucketWidth = 7L)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val naive = points.join(ivs, col("x") >= col("lo") && col("x") <= col("hi"))
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == naive)
    assert(got.contains((2L, 100L)), "lo bound inclusive")
    assert(got.contains((4L, 100L)), "hi bound inclusive")
    assert(got.contains((7L, 102L)), "negative domain buckets correctly")
    assert(!got.exists(_._1 == 6L), "gap points match nothing")
  }

  test("asof: null timestamps never match, null-time left rows pass through") {
    import spark.implicits._
    val l = Seq((1L, "s", Some(100L)), (2L, "s", None), (3L, "s", Some(5L)))
      .toDF("id", "sym", "t_ms")
    val r = Seq(("s", Some(50L), "good"), ("s", None, "ghost"))
      .toDF("sym", "q_ms", "quote")
    val out = ops.Temporal.asofJoin(l, r, Seq("sym"), "t_ms", "q_ms")
      .select($"id", $"quote").as[(Long, Option[String])].collect().toMap
    assert(out(1L).contains("good"), "real prior quote matches")
    assert(out(2L).isEmpty, "null-time left row must not adopt a match")
    assert(out(3L).isEmpty,
      "row before every real quote must not match the null-time ghost")
    assert(out.size == 3, "null-time left rows stay in the output")
    val fwd = ops.Temporal.asofJoin(l, r, Seq("sym"), "t_ms", "q_ms",
        direction = "forward")
      .select($"id", $"quote").as[(Long, Option[String])].collect().toMap
    assert(fwd(2L).isEmpty, "forward: null-time left row must not match")
    assert(fwd(1L).isEmpty && fwd(3L).contains("good"))
  }

  test("funnel: strict ordering, broken steps null out, non-entrants absent") {
    import spark.implicits._
    val ev = Seq(
      // user 1: full funnel in order
      (1L, "view", 10L), (1L, "click", 20L), (1L, "buy", 30L),
      // user 2: click BEFORE the first view — funnel breaks at step 2
      (2L, "click", 5L), (2L, "view", 10L), (2L, "buy", 50L),
      // user 3: view only
      (3L, "view", 10L),
      // user 4: never viewed — not in the output at all
      (4L, "click", 10L), (4L, "buy", 20L),
      // user 5: same-timestamp click (NOT strictly after) then later one
      (5L, "view", 10L), (5L, "click", 10L), (5L, "click", 40L), (5L, "buy", 45L))
      .toDF("user_id", "event_type", "tms")
    val out = ops.Temporal.funnel(ev, "user_id", "event_type", "tms",
        Seq("view", "click", "buy"))
      .select($"user_id", $"t1", $"t2", $"t3")
      .as[(Long, Option[Long], Option[Long], Option[Long])]
      .collect().map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(out(1L) == ((Some(10L), Some(20L), Some(30L))))
    // user 2's pre-view click must not count; the buy at 50 needs a
    // click after the view, which never happens
    assert(out(2L) == ((Some(10L), None, None)))
    assert(out(3L) == ((Some(10L), None, None)))
    assert(!out.contains(4L))
    // strictness: click@10 == view@10 rejected, click@40 accepted
    assert(out(5L) == ((Some(10L), Some(40L), Some(45L))))
    assert(out.size == 4)
  }

  test("resampleFill: gaps become rows, forward fill carries last value") {
    import spark.implicits._
    val ev = Seq(
      // user 1: bins 0 and 30 observed; 10 and 20 are gaps
      (1L, 1L, 5.0), (1L, 9L, 5.0), (1L, 35L, 1.0),
      // user 2: single bin — no gaps, grid is one row
      (2L, 12L, 7.0))
      .toDF("user_id", "t_ms", "value")
    val out = ops.Temporal.resampleFill(ev, "user_id", "t_ms", "value", stepMs = 10L)
      .select($"user_id", $"bin_ms", $"n_events", $"filled_value", $"is_gap")
      .as[(Long, Long, Long, Double, Int)]
      .collect().map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    assert(out((1L, 0L)) == ((2L, 10.0, 0)))   // two events summed
    assert(out((1L, 10L)) == ((0L, 10.0, 1)))  // gap: carries 10.0 forward
    assert(out((1L, 20L)) == ((0L, 10.0, 1)))
    assert(out((1L, 30L)) == ((1L, 1.0, 0)))   // fresh observation replaces
    assert(out((2L, 10L)) == ((1L, 7.0, 0)))
    assert(out.size == 5) // grids span each user's own [min, max] only
  }

  test("retention: known cohort triangle") {
    import spark.implicits._
    import java.sql.Timestamp
    def t(day: Long) = new Timestamp(day * 86400000L)
    // users 1,2 sign up day 0; user 1 active days 0,1; user 2 days 0,2;
    // user 3 signs up day 1, active day 1 only; user 4 never signs up
    val ev = Seq(
      (1L, "signup", t(0)), (1L, "view", t(1)),
      (2L, "signup", t(0)), (2L, "click", t(2)),
      (3L, "signup", t(1)),
      (4L, "view", t(0)), (4L, "view", t(5)))
      .toDF("user_id", "event_type", "ts")
    val days = ev.select($"user_id", $"event_type",
      floor(unix_millis($"ts") / lit(86400000L)).as("day"))
    val tri = ops.Events.retention(days, "user_id", "event_type", "day", "signup")
      .as[(Long, Long, Long)].collect().toSet
    assert(tri == Set((0L, 0L, 2L), (0L, 1L, 1L), (0L, 2L, 1L), (1L, 0L, 1L)),
      s"triangle wrong: $tri")
  }

  test("temporal plans: no nested-loop or cartesian join, single key shuffle for asof") {
    val sf = "/root/testdata/sf0.001"
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      def badNodes(df: org.apache.spark.sql.DataFrame): Seq[String] =
        df.queryExecution.executedPlan.collect {
          case b: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec =>
            b.nodeName
          case c: org.apache.spark.sql.execution.joins.CartesianProductExec =>
            c.nodeName
        }
      val asof = SparkEntry.queries("ev_asof_attribution")(spark, sf)
      assert(badNodes(asof).isEmpty, "asof must never nested-loop")
      // the union+window CORE costs exactly one exchange (on the key) —
      // measured on the bare operator; the catalog query adds its own
      // pre-aggregation and presentation-sort exchanges around it
      val core = ops.Temporal.asofJoin(trades, quotes, Seq("sym"), "t_ms", "q_ms")
      val exchanges = core.queryExecution.executedPlan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }
      assert(exchanges.size == 1, s"asof core should shuffle once, saw ${exchanges.size}")
      val range = SparkEntry.queries("ev_range_attribution")(spark, sf)
      assert(badNodes(range).isEmpty,
        "banded range join must plan as an equi-join")
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqe)
  }
}
