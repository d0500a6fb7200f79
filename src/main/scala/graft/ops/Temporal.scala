package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import graft.{GQuery, Tables => T}

/** Temporal join operators the built-in relational surface lacks (the
  * "compose existing ops" preference of SURVEY.md §7.3): AS-OF joins and
  * range (interval) joins, both expressed as single-shuffle declarative
  * plans — never a BroadcastNestedLoopJoin or cartesian product, which is
  * what a naive `l.t >= r.t` theta-join degenerates to and the first
  * thing that dies at 100 TB.
  *
  * Fixture queries run over `events` (click→purchase attribution), with
  * DuckDB's native `ASOF JOIN` / inequality joins as the oracle. All time
  * comparisons live in epoch-ms BIGINT space (TESTDATA ns trap — see
  * graft.ops.Events).
  */
object Temporal {

  /** AS-OF join (time-series point lookup, the shape of feature-store /
    * mark-to-market / "latest reading before the event" queries): for
    * every left row, the single most recent right row of the same key
    * with `rightTime <= leftTime` (direction "backward", inclusive), or
    * the earliest with `rightTime >= leftTime` ("forward"). Left rows
    * without a match keep null right columns (left-outer semantics).
    *
    * Plan shape — the scalable union trick, not a theta-join: both sides
    * are unioned and window-scanned once, so the cost is ONE hash
    * exchange on the key plus a per-key sort, identical to a groupBy at
    * the same cardinality. A theta-join `l.user = r.user AND l.t >= r.t`
    * would pick every preceding row (wrong) or, de-correlated, plan as a
    * per-key cross product — O(nl·nr) per key — that AQE cannot save.
    *
    *   1. right rows become (key, _t = rightTime, _r = struct(payload));
    *   2. left rows union in with _r = null, tagged to sort AFTER right
    *      rows at equal time (inclusive match);
    *   3. `last(_r, ignoreNulls)` over (key ORDER BY _t, _side ROWS
    *      UNBOUNDED PRECEDING..CURRENT) carries the latest right payload
    *      forward onto each left row;
    *   4. left rows re-emerge with the payload expanded.
    *
    * Contracts: right's non-key columns (the payload, including
    * `rightTime` under its own name) must not collide with left columns —
    * pre-alias the right side. Ties on (key, rightTime) resolve to the
    * greatest payload struct (field order = right column order); pre-
    * aggregate the right side (e.g. max_by per key+time) when tie-breaks
    * must follow a business rule. `tolerance` (same unit as the time
    * columns, which must then be numeric — use epoch-ms) nulls out
    * matches further than the window, mirroring pandas.merge_asof.
    */
  def asofJoin(
      left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String,
      direction: String = "backward",
      tolerance: Option[Long] = None): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"direction must be backward|forward, got $direction")
    val payload = right.columns.filterNot(keys.contains)
    val clash = payload.toSet & left.columns.toSet
    require(clash.isEmpty,
      s"right payload columns collide with left: ${clash.mkString(",")} — alias the right side")
    // the plan reserves helper columns; an input already carrying one
    // would corrupt the scan order or break resolution mid-plan
    val reserved = Set("_t", "_side", "_r", "_m")
    val taken = (left.columns ++ right.columns).toSet & reserved
    require(taken.isEmpty,
      s"input columns collide with asofJoin internals: ${taken.mkString(",")} — rename them")

    // null times never match: a right row with an unknown time would
    // otherwise sort to an end of the scan and get handed out as a
    // spurious "nearest" match (backward's asc = NULLS FIRST puts it
    // before everything; forward's desc = NULLS LAST mirrors it), and a
    // null-time left row would adopt whatever the scan edge holds.
    // Right nulls are dropped; left nulls re-enter the output unmatched.
    val r = right.filter(col(rightTime).isNotNull).select(
      keys.map(col) ++ Seq(col(rightTime).as("_t"), lit(0).as("_side"),
        struct(payload.map(col): _*).as("_r")): _*)
    val rType = r.schema("_r").dataType.asInstanceOf[StructType]
    val lNullTime = left.filter(col(leftTime).isNull)
    val l = left.filter(col(leftTime).isNotNull).select(
      left.columns.map(col) ++ Seq(col(leftTime).as("_t"), lit(1).as("_side"),
        lit(null).cast(rType).as("_r")): _*)
    val unioned = l.unionByName(r, allowMissingColumns = true)

    // backward: scan time ascending, right rows first at equal _t (so an
    // exactly-simultaneous reading matches — inclusive); forward is the
    // mirror image. `_r` ascending makes equal-time right rows resolve
    // deterministically (greatest struct wins under last()).
    val ord =
      if (direction == "backward") Seq(col("_t").asc, col("_side").asc, col("_r").asc)
      else Seq(col("_t").desc, col("_side").asc, col("_r").asc)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched0 = last(col("_r"), ignoreNulls = true).over(w)
    val matched = tolerance.fold(matched0) { tol =>
      val rt = matched0.getField(rightTime)
      val dist =
        if (direction == "backward") col("_t") - rt else rt - col("_t")
      when(dist <= tol, matched0)
    }
    unioned
      .withColumn("_m", matched)
      .filter(col("_side") === 1)
      .select(left.columns.map(col) ++
        payload.map(p => col("_m").getField(p).as(p)): _*)
      .unionByName(lNullTime.select(left.columns.map(col) ++
        payload.map(p => lit(null).cast(rType(p).dataType).as(p)): _*))
  }

  /** Range (interval) join: pair every point row with every interval row
    * whose `[lo, hi]` contains its `pointCol` (inclusive both ends) —
    * the attribution-window / IP-range-lookup / sensor-calibration-epoch
    * shape. Returns the joined rows with both sides' columns (names must
    * be disjoint).
    *
    * Plan shape — bucketed banding: intervals explode to the fixed-width
    * buckets they overlap (`sequence(floor(lo/w), floor(hi/w))`), points
    * map to their single bucket, and the join becomes an EQUI-join on
    * the bucket id with the `BETWEEN` predicate as a residual filter —
    * a shuffle hash join Catalyst/AQE can size and skew-split, instead
    * of the BroadcastNestedLoopJoin a bare inequality join plans (which
    * at 100 TB means shipping one whole side to every task). Each point
    * owns exactly one bucket, so no dedup pass is needed. Pick
    * `bucketWidth` near the typical interval length: an interval
    * produces `len/width + 1` exploded rows, so the blow-up stays O(1)
    * while each bucket's population stays selective.
    */
  def rangeJoin(
      points: DataFrame, pointCol: String,
      intervals: DataFrame, loCol: String, hiCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    val clash = points.columns.toSet & intervals.columns.toSet
    require(clash.isEmpty,
      s"point/interval columns collide: ${clash.mkString(",")} — alias one side")
    val taken = (points.columns ++ intervals.columns).toSet & Set("_pb", "_ib")
    require(taken.isEmpty,
      s"input columns collide with rangeJoin internals: ${taken.mkString(",")} — rename them")
    val b = intervals.withColumn("_ib",
      explode(sequence(floor(col(loCol) / bucketWidth),
        floor(col(hiCol) / bucketWidth))))
    val p = points.withColumn("_pb", floor(col(pointCol) / bucketWidth))
    p.join(b, col("_pb") === col("_ib") &&
        col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("_pb", "_ib")
  }

  /** Regular-grid resample with gap fill + forward fill — the missing-
    * bucket repair every time-series feature pipeline runs before
    * training (a model fed per-hour activity must see the silent hours
    * as rows, not absences). Buckets `timeMs` to `stepMs`-wide bins,
    * aggregates count+sum per (entity, bin), then materializes each
    * entity's FULL bin range (`sequence(min, max, step)` exploded) and
    * left-joins the observations back: gap bins get count 0 and carry
    * the last observed value forward (`last(..., ignoreNulls)` over an
    * entity-ordered running frame).
    *
    * Plan shape at 100 TB: the raw scan collapses to bin granularity in
    * ONE map-side-combined aggregate before anything else — everything
    * downstream is bin-scale, not event-scale. The grid explode is
    * bounded per entity by span/step (observation span over resolution,
    * NOT event count), the grid↔obs join is an equi-join on
    * (entity, bin), and the fill window is one entity-keyed shuffle of
    * bin-scale rows. Nothing quadratic, nothing event-scale past the
    * first aggregate.
    */
  def resampleFill(
      events: DataFrame, entityCol: String, timeMsCol: String,
      valueCol: String, stepMs: Long): DataFrame = {
    require(stepMs > 0, s"stepMs must be positive, got $stepMs")
    val obs = events
      .select(col(entityCol),
        (expr(s"$timeMsCol div $stepMs") * stepMs).as("bin_ms"),
        col(valueCol).as("_v"))
      .groupBy(col(entityCol), col("bin_ms"))
      .agg(count(lit(1)).as("_n"), round(sum(col("_v")), 2).as("_sv"))
    val grid = obs.groupBy(col(entityCol))
      .agg(min(col("bin_ms")).as("_lo"), max(col("bin_ms")).as("_hi"))
      .select(col(entityCol),
        explode(sequence(col("_lo"), col("_hi"), lit(stepMs))).as("bin_ms"))
    val fill = Window.partitionBy(col(entityCol)).orderBy(col("bin_ms"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(obs, Seq(entityCol, "bin_ms"), "left_outer")
      .select(col(entityCol), col("bin_ms"),
        coalesce(col("_n"), lit(0L)).as("n_events"),
        last(col("_sv"), ignoreNulls = true).over(fill).as("filled_value"),
        when(col("_n").isNull, 1).otherwise(0).as("is_gap"))
  }

  /** Ordered funnel analysis (view → click → purchase …): per entity,
    * the earliest strictly-increasing completion of each step — the
    * conversion/attribution query of every product-analytics stack.
    * Returns one row per entity that entered the funnel, with step
    * times t1..tk (null from the first broken step on).
    *
    * Plan shape: k-1 chained left joins, each an EQUI-join on the
    * entity key with the time inequality as a residual predicate plus a
    * map-side-combinable min aggregate — never a nested-loop, state
    * bounded by entities, each step join pruned to that step's events
    * (pushed-down type filter). At 100 TB: k-1 key-shuffles of
    * per-step event subsets, nothing quadratic.
    */
  def funnel(
      events: DataFrame, entityCol: String, typeCol: String,
      timeCol: String, steps: Seq[String]): DataFrame = {
    require(steps.size >= 2, s"a funnel needs at least 2 steps, got $steps")
    val base = events.filter(col(typeCol) === steps.head)
      .groupBy(col(entityCol)).agg(min(col(timeCol)).as("t1"))
    steps.tail.zipWithIndex.foldLeft(base) { case (acc, (st, i)) =>
      val prev = s"t${i + 1}"
      val cur = s"t${i + 2}"
      val e = events.filter(col(typeCol) === st)
        .select(col(entityCol).as("_u"), col(timeCol).as("_t"))
      acc.join(e, col(entityCol) === col("_u") && col("_t") > col(prev),
          "left_outer")
        .groupBy(acc.columns.map(col): _*)
        .agg(min(col("_t")).as(cur))
    }
  }

  // ---- fixture queries ------------------------------------------------

  /** purchases / clicks of the events fixture in epoch-ms space. Clicks
    * pre-aggregate to one row per (user, ms): simultaneous clicks would
    * otherwise make the as-of tie-break engine-specific (greatest-struct
    * here, arbitrary in DuckDB's ASOF) — the dedup pins ONE deterministic
    * answer on both sides.
    */
  private def purchases(s: org.apache.spark.sql.SparkSession, d: String): DataFrame =
    T.events(s, d).filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), unix_millis(col("ts")).as("t_ms"))

  private def clicks(s: org.apache.spark.sql.SparkSession, d: String): DataFrame =
    T.events(s, d).filter(col("event_type") === "click")
      .select(col("user_id"), unix_millis(col("ts")).as("click_ms"),
        col("event_id").as("click_id"), col("value").as("click_value"))
      .groupBy(col("user_id"), col("click_ms"))
      .agg(max(col("click_id")).as("click_id"),
        max_by(col("click_value"), col("click_id")).as("click_value"))

  val queries: Seq[GQuery] = Seq(

    // ---- AS-OF: each purchase ← the user's latest prior click ---------
    GQuery("ev_asof_attribution",
      (s, d) => asofJoin(
        purchases(s, d),
        clicks(s, d).select(col("user_id"), col("click_ms"),
          col("click_id"), col("click_value")),
        keys = Seq("user_id"), leftTime = "t_ms", rightTime = "click_ms")
        .orderBy("event_id"),
      Some("""WITH l AS (SELECT event_id, user_id, epoch_ms(ts) AS t_ms
                FROM events WHERE event_type = 'purchase'),
             c0 AS (SELECT user_id, epoch_ms(ts) AS click_ms,
                      event_id AS click_id, value AS click_value
                FROM events WHERE event_type = 'click'),
             c AS (SELECT user_id, click_ms, max(click_id) AS click_id,
                      arg_max(click_value, click_id) AS click_value
                FROM c0 GROUP BY 1, 2)
        SELECT l.event_id, l.user_id, l.t_ms,
               c.click_ms, c.click_id, c.click_value
        FROM l ASOF LEFT JOIN c
          ON l.user_id = c.user_id AND l.t_ms >= c.click_ms
        ORDER BY l.event_id""")),

    // ---- FUNNEL: view → click → purchase, strictly increasing times ---
    GQuery("ev_funnel",
      (s, d) => funnel(
        T.events(s, d).select(col("user_id"), col("event_type"),
          unix_millis(col("ts")).as("tms")),
        "user_id", "event_type", "tms",
        Seq("view", "click", "purchase"))
        .select(col("user_id"), col("t1").as("t1_ms"), col("t2").as("t2_ms"),
          col("t3").as("t3_ms"),
          when(col("t3").isNotNull, 1).otherwise(0).as("completed"))
        .orderBy("user_id"),
      Some("""WITH e AS (SELECT user_id, event_type, epoch_ms(ts) AS tms
                FROM events),
           s1 AS (SELECT user_id, min(tms) AS t1 FROM e
                  WHERE event_type = 'view' GROUP BY 1),
           s2 AS (SELECT s1.user_id, s1.t1, min(e.tms) AS t2
                  FROM s1 LEFT JOIN e ON e.user_id = s1.user_id
                    AND e.event_type = 'click' AND e.tms > s1.t1
                  GROUP BY 1, 2),
           s3 AS (SELECT s2.user_id, s2.t1, s2.t2, min(e.tms) AS t3
                  FROM s2 LEFT JOIN e ON e.user_id = s2.user_id
                    AND e.event_type = 'purchase' AND e.tms > s2.t2
                  GROUP BY 1, 2, 3)
        SELECT user_id, t1 AS t1_ms, t2 AS t2_ms, t3 AS t3_ms,
          CAST(CASE WHEN t3 IS NOT NULL THEN 1 ELSE 0 END AS INT) AS completed
        FROM s3 ORDER BY user_id""")),

    // ---- RESAMPLE: per-user hourly grid, gaps filled forward ----------
    // hour bins with no activity become explicit rows (n_events=0,
    // is_gap=1) carrying the last observed hour-sum forward; the first
    // bin of every user is observed by construction (the grid starts at
    // min(bin)), so filled_value is never null
    GQuery("ev_resample",
      (s, d) => resampleFill(
        T.events(s, d).select(col("user_id"),
          unix_millis(col("ts")).as("t_ms"), col("value")),
        "user_id", "t_ms", "value", stepMs = 3600000L)
        .withColumnRenamed("bin_ms", "hour_ms")
        .orderBy("user_id", "hour_ms"),
      Some("""WITH e AS (SELECT user_id,
                (epoch_ms(ts) // 3600000) * 3600000 AS h, value FROM events),
           obs AS (SELECT user_id, h, count(*) AS n, round(sum(value), 2) AS v
                   FROM e GROUP BY 1, 2),
           span AS (SELECT user_id, min(h) AS lo, max(h) AS hi
                    FROM obs GROUP BY 1),
           grid AS (SELECT user_id,
                      unnest(range(lo, hi + 3600000, 3600000)) AS h
                    FROM span),
           j AS (SELECT g.user_id, g.h, obs.n, obs.v
                 FROM grid g LEFT JOIN obs ON g.user_id = obs.user_id
                  AND g.h = obs.h)
        SELECT user_id, h AS hour_ms,
          CAST(coalesce(n, 0) AS BIGINT) AS n_events,
          last_value(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY h
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_value,
          CAST(CASE WHEN v IS NULL THEN 1 ELSE 0 END AS INT) AS is_gap
        FROM j ORDER BY user_id, hour_ms""")),

    // ---- RANGE: clicks (any user) inside each purchase's 5-min window -
    GQuery("ev_range_attribution",
      (s, d) => {
        val win = 5 * 60 * 1000L
        val p = purchases(s, d)
          .withColumn("lo_ms", col("t_ms") - win)
        val c = clicks(s, d).select(col("click_ms"))
        val pairs = rangeJoin(c, "click_ms",
          p.select(col("event_id"), col("lo_ms"), col("t_ms").as("hi_ms")),
          "lo_ms", "hi_ms", bucketWidth = win)
        // left-join the pair counts back so zero-click purchases remain
        val counts = pairs.groupBy(col("event_id")).agg(count(lit(1)).as("n_clicks"))
        p.select(col("event_id"), col("t_ms"))
          .join(counts, Seq("event_id"), "left_outer")
          .withColumn("n_clicks", coalesce(col("n_clicks"), lit(0L)))
          .orderBy("event_id")
      },
      Some("""WITH p AS (SELECT event_id, epoch_ms(ts) AS t_ms
                FROM events WHERE event_type = 'purchase'),
             c0 AS (SELECT user_id, epoch_ms(ts) AS click_ms
                FROM events WHERE event_type = 'click'),
             c AS (SELECT user_id, click_ms FROM c0 GROUP BY 1, 2)
        SELECT p.event_id, p.t_ms,
               CAST((SELECT count(*) FROM c
                     WHERE c.click_ms BETWEEN p.t_ms - 300000 AND p.t_ms)
                 AS BIGINT) AS n_clicks
        FROM p ORDER BY event_id"""))
  )
}
