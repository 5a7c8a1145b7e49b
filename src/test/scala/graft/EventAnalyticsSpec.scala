package graft

import graft.operators.ReconOps
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Event-sequence analytics (ReconOps [EXT]): as-of join semantics
  * (at-or-before inclusive, deterministic ties, no-match nulls, staleness
  * tolerance), gap sessionization boundaries, ordered-funnel stage rules,
  * and retention cohort offsets — all on planted event frames written as
  * an events.parquet table so the DECLARED query functions (not just
  * cores) are what runs. */
class EventAnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private val T0 = 1704067200L // 2024-01-01 00:00:00 UTC (a Monday)
  private def ts(secOff: Long) = T0 + secOff
  private val Day = 86400L
  private val Hour = 3600L

  /** (event_id, sec, user_id, event_type, value) → events.parquet dir. */
  private def eventsDir(name: String,
      rows: Seq[(Long, Long, Long, String, Double)]): String = {
    val dir = s"/tmp/graft_evspec_$name"
    rows.toDF("event_id", "sec", "user_id", "event_type", "value")
      .select(col("event_id"), timestamp_seconds(col("sec")).as("ts"),
        col("user_id"), col("event_type"), col("value"),
        lit("{}").as("props"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private def asofMap(df: DataFrame): Map[Long, Option[Long]] =
    df.collect().map { r =>
      r.getAs[Long]("event_id") ->
        Option(r.getAs[java.lang.Long]("p_event_id")).map(_.toLong)
    }.toMap

  lazy val asofDir: String = eventsDir("asof", Seq(
    // u1: purchases at day 0 and day 10; clicks straddling them
    (1001L, ts(0), 1L, "purchase", 1.0),
    (1002L, ts(10 * Day), 1L, "purchase", 2.0),
    (1L, ts(1 * Day), 1L, "click", 0.0),
    (2L, ts(9 * Day), 1L, "click", 0.0),
    (3L, ts(10 * Day), 1L, "click", 0.0), // equal ts: at-or-before matches
    (4L, ts(-1 * Day), 1L, "click", 0.0), // before any purchase: no match
    // u2: two purchases at the SAME instant — max tie id must win
    (2001L, ts(0), 2L, "purchase", 5.0),
    (2002L, ts(0), 2L, "purchase", 6.0),
    (5L, ts(1 * Day), 2L, "click", 0.0),
    // u3: click with no purchases at all
    (6L, ts(0), 3L, "click", 0.0)))

  test("as-of join: at-or-before inclusive, ties by max id, nulls on no match") {
    val got = asofMap(ReconOps.asofJoin(spark, asofDir))
    assert(got == Map(
      1L -> Some(1001L), 2L -> Some(1001L), 3L -> Some(1002L),
      4L -> None, 5L -> Some(2002L), 6L -> None))
    // the matched payload value rides the same row as the matched id
    val v = ReconOps.asofJoin(spark, asofDir).where(col("event_id") === 5)
      .select(col("p_value")).head().getDouble(0)
    assert(v == 6.0)
  }

  test("as-of tolerance: stale matches null out, fresh ones survive") {
    val got = asofMap(ReconOps.asofTolerance(spark, asofDir))
    // click 2 is 9 days after its only prior purchase — beyond the
    // 7-day bound; click 1 (1 day) and click 3 (same instant) survive
    assert(got == Map(
      1L -> Some(1001L), 2L -> None, 3L -> Some(1002L),
      4L -> None, 5L -> Some(2002L), 6L -> None))
  }

  test("forward as-of: earliest at-or-after, min-id ties, latency seconds") {
    val got = ReconOps.asofForward(spark, asofDir).collect()
      .map(r => r.getAs[Long]("event_id") ->
        (Option(r.getAs[java.lang.Long]("p_event_id")).map(_.toLong),
          Option(r.getAs[java.lang.Long]("latency_sec")).map(_.toLong)))
      .toMap
    assert(got == Map(
      1L -> (Some(1002L), Some(9 * Day)),  // next purchase is day 10
      2L -> (Some(1002L), Some(1 * Day)),
      3L -> (Some(1002L), Some(0L)),       // equal ts: at-or-after inclusive
      4L -> (Some(1001L), Some(1 * Day)),  // pre-window click → first purchase
      5L -> (None, None),                  // u2 purchases are all BEFORE
      6L -> (None, None)))                 // u3 has none
    // equal-instant forward ties pick the MIN id: u2 click AT the
    // double-purchase instant
    val dir2 = eventsDir("fwdtie", Seq(
      (2001L, ts(0), 2L, "purchase", 5.0),
      (2002L, ts(0), 2L, "purchase", 6.0),
      (7L, ts(0), 2L, "click", 0.0)))
    val tie = ReconOps.asofForward(spark, dir2).head()
    assert(tie.getAs[Long]("p_event_id") == 2001L)
  }

  test("as-of core result equals the naive per-row argmax on planted data") {
    // independent oracle: for each left row take the max-(ts, tie) right
    // row at-or-before, computed by a plain O(n²) collect-side scan
    val left = Seq((1L, 10L, 100L), (1L, 20L, 101L), (2L, 5L, 102L))
      .toDF("user_id", "sec", "event_id")
      .select(col("user_id"), timestamp_seconds(col("sec")).as("ts"),
        col("event_id"))
    val right = Seq((1L, 10L, 7L, 1.0), (1L, 15L, 8L, 2.0),
        (1L, 15L, 9L, 3.0), (2L, 6L, 10L, 4.0))
      .toDF("user_id", "sec", "p_event_id", "p_value")
      .select(col("user_id"), timestamp_seconds(col("sec")).as("ts"),
        col("p_event_id"), col("p_value"))
    val got = ReconOps.asofJoinCore(left, right, "user_id", "ts", "p_event_id")
      .select(col("event_id"), col("matched.p_event_id").as("m"))
      .collect().map(r => r.getAs[Long]("event_id") ->
        Option(r.getAs[java.lang.Long]("m")).map(_.toLong)).toMap
    val rrows = Seq((1L, 10L, 7L), (1L, 15L, 8L), (1L, 15L, 9L), (2L, 6L, 10L))
    val lrows = Seq((1L, 10L, 100L), (1L, 20L, 101L), (2L, 5L, 102L))
    val want = lrows.map { case (u, t, id) =>
      val c = rrows.filter(r => r._1 == u && r._2 <= t)
      id -> (if (c.isEmpty) None else Some(c.maxBy(r => (r._2, r._3))._3))
    }.toMap
    assert(got == want)
  }

  test("salted as-of: scan decomposition equals the plain form " +
      "(planted, tiny buckets, randomized)") {
    val plain = asofMap(ReconOps.asofJoin(spark, asofDir))
    assert(asofMap(ReconOps.asofSalted(spark, asofDir)) == plain)
    // 1-day buckets force cross-bucket carries on the planted data
    // (matches span 10 days) — every carry path exercises
    val ev = graft.sources.Tables.events(spark, asofDir)
    val clicks = ev.where(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id"))
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"),
        col("event_id").as("p_event_id"), col("value").as("p_value"))
    val tiny = ReconOps.asofJoinSaltedCore(clicks, purchases,
        "user_id", "ts", "p_event_id", bucketWidthUs = Day * 1000000L)
      .select(col("event_id"),
        col("matched.p_event_id").as("p_event_id"))
    val tinyMap = tiny.collect().map(r => r.getLong(0) ->
      Option(r.getAs[java.lang.Long]("p_event_id")).map(_.toLong)).toMap
    assert(tinyMap == plain,
      s"cross-bucket carries must reproduce the plain matches: $tinyMap")
    // randomized: equal-ts ties, empty buckets, users with no purchases
    val rnd = new scala.util.Random(7)
    val rows = (1L to 500L).map { i =>
      (i, ts(rnd.nextInt((30 * Day).toInt).toLong), rnd.nextInt(5).toLong + 1,
        if (rnd.nextBoolean()) "click" else "purchase",
        rnd.nextInt(100) / 10.0)
    }
    val dir = eventsDir("saltrnd", rows)
    assert(asofMap(ReconOps.asofSalted(spark, dir)) ==
      asofMap(ReconOps.asofJoin(spark, dir)))
  }

  test("salted FORWARD as-of: min_by/desc mirror equals the plain " +
      "forward form (tiny buckets force carries, randomized)") {
    def sides(dir: String) = {
      val ev = graft.sources.Tables.events(spark, dir)
      val clicks = ev.where(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id"))
      val purchases = ev.where(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"),
          col("event_id").as("p_event_id"), col("value").as("p_value"))
      (clicks, purchases)
    }
    def fwdMap(df: org.apache.spark.sql.DataFrame) =
      df.select(col("event_id"),
          col("matched.p_event_id").as("p_event_id"))
        .collect().map(r => r.getLong(0) ->
          Option(r.getAs[java.lang.Long]("p_event_id")).map(_.toLong))
        .toMap
    // randomized: equal-ts ties, empty buckets, users w/o purchases
    val rnd = new scala.util.Random(11)
    val rndDir = eventsDir("saltfwd", (1L to 500L).map { i =>
      (i, ts(rnd.nextInt((30 * Day).toInt).toLong),
        rnd.nextInt(5).toLong + 1,
        if (rnd.nextBoolean()) "click" else "purchase",
        rnd.nextInt(100) / 10.0)
    })
    for (dir <- Seq(asofDir, rndDir)) {
      val (clicks, purchases) = sides(dir)
      val plain = fwdMap(ReconOps.asofJoinCore(clicks, purchases,
        "user_id", "ts", "p_event_id", forward = true))
      val salted = fwdMap(ReconOps.asofJoinSaltedCore(clicks, purchases,
        "user_id", "ts", "p_event_id", bucketWidthUs = Day * 1000000L,
        forward = true))
      assert(salted == plain,
        s"forward carries must reproduce the plain matches in $dir")
    }
  }

  test("sessionize: strict-gap boundary — 48h stays, over 48h splits") {
    val dir = eventsDir("sess", Seq(
      // u1: gaps 47h59m then 49h → sessions (2 events, 1 event)
      (1L, ts(0), 1L, "view", 0.0),
      (2L, ts(48 * Hour - 60), 1L, "view", 0.0),
      (3L, ts(48 * Hour - 60 + 49 * Hour), 1L, "view", 0.0),
      // u2: EXACTLY 48h gap — rule is strict >, same session
      (4L, ts(0), 2L, "view", 0.0),
      (5L, ts(48 * Hour), 2L, "view", 0.0)))
    val got = ReconOps.sessionize(spark, dir).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("session_n")) ->
        (r.getAs[Long]("n_events"), r.getAs[Long]("span_us"))).toMap
    assert(got == Map(
      (1L, 1L) -> (2L, (48 * Hour - 60) * 1000000L),
      (1L, 2L) -> (1L, 0L),
      (2L, 1L) -> (2L, 48 * Hour * 1000000L)))
  }

  test("funnel: stages require order, equal timestamps count (>=)") {
    val dir = eventsDir("funnel", Seq(
      // u5: signup, click at the SAME instant (counts), purchase BEFORE
      // the click (does not)
      (1L, ts(0), 5L, "signup", 0.0),
      (2L, ts(0), 5L, "click", 0.0),
      (3L, ts(-Day), 5L, "purchase", 0.0),
      // u6: click only — never enters the funnel
      (4L, ts(0), 6L, "click", 0.0),
      // u7: full ordered path
      (5L, ts(0), 7L, "signup", 0.0),
      (6L, ts(1), 7L, "click", 0.0),
      (7L, ts(2), 7L, "purchase", 0.0)))
    val got = ReconOps.eventFunnel(spark, dir).collect()
      .map(r => r.getAs[String]("stage") -> r.getAs[Long]("n_users")).toMap
    assert(got == Map("1_signup" -> 2L, "2_click" -> 2L, "3_purchase" -> 1L))
  }

  test("N-stage funnel: equal-ts rule at EVERY hop, min-ts carry, order") {
    val dir = eventsDir("funneln", Seq(
      // u1: all four stages at the SAME instant — >= at every hop, so
      // the user survives to the last stage
      (1L, ts(0), 1L, "signup", 0.0),
      (2L, ts(0), 1L, "view", 0.0),
      (3L, ts(0), 1L, "click", 0.0),
      (4L, ts(0), 1L, "purchase", 0.0),
      // u2: ordered path but the purchase precedes the click — drops at
      // the final hop only
      (5L, ts(0), 2L, "signup", 0.0),
      (6L, ts(1), 2L, "view", 0.0),
      (7L, ts(3), 2L, "click", 0.0),
      (8L, ts(2), 2L, "purchase", 0.0),
      // u3: min-ts carry — the qualifying view is the EARLIEST
      // at-or-after signup (ts 1), so the click at ts 2 counts even
      // though a later view (ts 5) exists
      (9L, ts(0), 3L, "signup", 0.0),
      (10L, ts(1), 3L, "view", 0.0),
      (11L, ts(5), 3L, "view", 0.0),
      (12L, ts(2), 3L, "click", 0.0),
      // u4: view before signup — drops at stage 2
      (13L, ts(0), 4L, "signup", 0.0),
      (14L, ts(-1), 4L, "view", 0.0)))
    val got = ReconOps.eventFunnelStages(spark, dir, ReconOps.FunnelStages4)
      .collect()
      .map(r => r.getAs[String]("stage") -> r.getAs[Long]("n_users")).toMap
    assert(got == Map("1_signup" -> 4L, "2_view" -> 3L, "3_click" -> 3L,
      "4_purchase" -> 1L))
    // the 3-stage declared query IS the generalized fold at its
    // original stage list — pinned so the refactor cannot drift
    val legacy = ReconOps.eventFunnel(spark, dir).collect()
      .map(r => r.getAs[String]("stage") -> r.getAs[Long]("n_users")).toMap
    val viaStages = ReconOps.eventFunnelStages(spark, dir,
        Seq("signup", "click", "purchase")).collect()
      .map(r => r.getAs[String]("stage") -> r.getAs[Long]("n_users")).toMap
    assert(legacy == viaStages)
  }

  test("approx quantiles: exact histogram picks + sketch inside its rank bound") {
    // 100 values i/4 dollars (exact in binary → cents = 25·i exactly):
    // p50 = 1250, p90 = 2250, p99 = 2475
    val dir = eventsDir("quant",
      (1L to 100L).map(i => (i, ts(i), 1L, "view", i / 4.0)))
    val r = ReconOps.approxQuantiles(spark, dir).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getAs[Long]("p50") == 1250L && row.getAs[Long]("p90") == 2250L
      && row.getAs[Long]("p99") == 2475L)
    assert(row.getAs[Boolean]("p50_within_bounds")
      && row.getAs[Boolean]("p90_within_bounds")
      && row.getAs[Boolean]("p99_within_bounds"))
  }

  test("retention: offsets are whole weeks from first-signup week, pre-signup excluded") {
    val dir = eventsDir("ret", Seq(
      // u8 signs up in week 0 (T0 is a Monday), active weeks 0 and 2,
      // and has pre-signup activity in week -1 that must NOT appear
      (1L, ts(-3 * Day), 8L, "view", 0.0),
      (2L, ts(2 * Day), 8L, "signup", 0.0),
      (3L, ts(3 * Day), 8L, "click", 0.0),
      (4L, ts(16 * Day), 8L, "view", 0.0),
      // u9 signs up in week 1 — a second cohort
      (5L, ts(8 * Day), 9L, "signup", 0.0)))
    val got = ReconOps.retentionCohorts(spark, dir).collect()
      .map(r => (r.getAs[String]("cohort_week"), r.getAs[Long]("week_offset"))
        -> r.getAs[Long]("n_users")).toMap
    assert(got == Map(
      ("2024-01-01", 0L) -> 1L, ("2024-01-01", 2L) -> 1L,
      ("2024-01-08", 0L) -> 1L))
  }

  test("salted sessionize: bucket decomposition equals the plain form " +
      "on boundary-crossing, multi-bucket, and at-the-bar sessions") {
    val gapUs = ReconOps.SessionGapHours * 3600L * 1000000L
    // 1-hour buckets force sessions across many buckets
    val bkt = 3600L * 1000000L
    val dir = eventsDir("saltsess", Seq(
      // u1: one session crossing a bucket boundary (30 min apart),
      // then a fresh session far later
      (1L, ts(0), 1L, "e", 0.0),
      (2L, ts(Hour / 2), 1L, "e", 0.0),
      (3L, ts(Hour + 10), 1L, "e", 0.0),
      (4L, ts(10 * Day), 1L, "e", 0.0),
      // u2: a session spanning THREE buckets via chained sub-gap hops
      (5L, ts(0), 2L, "e", 0.0),
      (6L, ts(Hour + 1), 2L, "e", 0.0),
      (7L, ts(2 * Hour + 2), 2L, "e", 0.0),
      // u3: adjacent events EXACTLY at the gap bar stay one session
      // (strict >), one microsecond past it splits
      (8L, ts(0), 3L, "e", 0.0),
      (9L, ts(0) + gapUs / 1000000L, 3L, "e", 0.0)))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    val plain = rows(ReconOps.sessionize(spark, dir))
    val salted = rows(ReconOps.sessionizeSalted(spark, dir, bkt))
    assert(salted == plain, s"salted=$salted plain=$plain")
    assert(plain((1L, 1L))._1 == 3L && plain((1L, 2L))._1 == 1L)
    assert(plain((2L, 1L))._1 == 3L, "three-bucket session must not split")
    assert(plain((3L, 1L))._1 == 2L, "exactly-at-bar stays one session")
    // full-corpus equality at the default production bucket width
    val full = eventsDir("saltsessfull",
      (1 to 400).map { i =>
        (i.toLong, ts(i.toLong * 7 * Hour % (90 * Day)),
          (i % 7).toLong, "e", 0.0)
      })
    assert(rows(ReconOps.sessionizeSalted(spark, full)) ==
      rows(ReconOps.sessionize(spark, full)))
  }

  test("sliding WAU: trailing 7-day distinct, window ends on active days") {
    // activity: day 0 {u1,u2}, day 3 {u2,u3}, day 10 {u1}
    // windows: end day0 -> {u1,u2}; end day3 -> [day-3..day3] covers
    // day0+day3 -> {u1,u2,u3}; end day10 -> [day4..day10] covers ONLY
    // day10 (day3 is 7 days back, outside the 7-day trailing window)
    val dir = eventsDir("wau", Seq(
      (1L, ts(0), 1L, "e", 0.0),
      (2L, ts(Hour), 2L, "e", 0.0),
      (3L, ts(3 * Day), 2L, "e", 0.0),
      (4L, ts(3 * Day + Hour), 3L, "e", 0.0),
      (5L, ts(10 * Day), 1L, "e", 0.0)))
    val got = ReconOps.slidingWau(spark, dir).collect()
      .map(r => r.getString(0) ->
        (r.getAs[Long]("exact_wau"), r.getAs[Boolean]("wau_within_bounds")))
      .toMap
    assert(got.keySet == Set("2024-01-01", "2024-01-04", "2024-01-11"),
      s"window ends are exactly the active days: $got")
    assert(got("2024-01-01")._1 == 2L)
    assert(got("2024-01-04")._1 == 3L)
    assert(got("2024-01-11")._1 == 1L, "day 3 activity ages out of the window")
    // tiny sets sit in the sketch's exact regime: bounds must hold
    assert(got.values.forall(_._2))
  }

  test("top paths: complete triples only, per-user order, count tiebreak") {
    // u1: a->b->c->d (paths a>b>c, b>c>d); u2: a->b->c (a>b>c);
    // u3: x->y (too short for any triple)
    val dir = eventsDir("paths", Seq(
      (1L, ts(0), 1L, "a", 0.0), (2L, ts(10), 1L, "b", 0.0),
      (3L, ts(20), 1L, "c", 0.0), (4L, ts(30), 1L, "d", 0.0),
      (5L, ts(0), 2L, "a", 0.0), (6L, ts(10), 2L, "b", 0.0),
      (7L, ts(20), 2L, "c", 0.0),
      (8L, ts(0), 3L, "x", 0.0), (9L, ts(10), 3L, "y", 0.0)))
    val got = ReconOps.topPaths(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(got.toMap == Map("a>b>c" -> 2L, "b>c>d" -> 1L), s"got $got")
    // ordering: count desc first, then path asc
    assert(got.head == ("a>b>c", 2L))
  }

  test("conversion latency: exact quantile picks, unconverted excluded") {
    // four conversions at 10/20/30/40 s, one click that never converts
    val dir = eventsDir("convlat", Seq(
      (1L, ts(0), 1L, "click", 0.0), (2L, ts(10), 1L, "purchase", 1.0),
      (3L, ts(100), 2L, "click", 0.0), (4L, ts(120), 2L, "purchase", 1.0),
      (5L, ts(200), 3L, "click", 0.0), (6L, ts(230), 3L, "purchase", 1.0),
      (7L, ts(300), 4L, "click", 0.0), (8L, ts(340), 4L, "purchase", 1.0),
      (9L, ts(400), 5L, "click", 0.0)))
    val r = ReconOps.conversionLatency(spark, dir).collect().head
    assert(r.getLong(0) == 5L && r.getLong(1) == 4L,
      "five clicks, four conversions")
    assert(r.getLong(2) == 20L, s"p50 is the rank-2 latency: $r")
    assert(r.getLong(3) == 40L, s"p90 is the rank-4 latency: $r")
    assert(r.getBoolean(4) && r.getBoolean(5),
      "sketch estimates inside their rank bounds")
  }

  test("growth accounting: new/retained/resurrected/churned, identities") {
    // u1 active weeks 0, 1, 3 (new, retained, resurrected — and churns
    // after weeks 1 and 3); u2 active week 0 only (new, churns after)
    val dir = eventsDir("growth", Seq(
      (1L, ts(0), 1L, "e", 0.0),
      (2L, ts(7 * Day + Hour), 1L, "e", 0.0),
      (3L, ts(21 * Day + 2 * Hour), 1L, "e", 0.0),
      (4L, ts(Hour), 2L, "e", 0.0)))
    val got = ReconOps.growthAccounting(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(got == Map(
      "2024-01-01" -> (2L, 2L, 0L, 0L, 1L),
      "2024-01-08" -> (1L, 0L, 1L, 0L, 1L),
      "2024-01-22" -> (1L, 0L, 0L, 1L, 1L)), s"got $got")
    // identities on sf data: active = new + retained + resurrected per
    // week, and retained(w+1) = active(w) - churned_after(w) for
    // consecutive calendar weeks
    val sf = ReconOps.growthAccounting(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(sf.nonEmpty)
    for ((wk, (act, nw, ret, res, _)) <- sf)
      assert(act == nw + ret + res, s"$wk: $act != $nw+$ret+$res")
    val fmt = java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd")
    for ((wk, (act, _, _, _, churn)) <- sf) {
      val next = java.time.LocalDate.parse(wk, fmt).plusDays(7).format(fmt)
      sf.get(next).foreach { case (_, _, retNext, _, _) =>
        assert(retNext == act - churn,
          s"$wk -> $next: retained $retNext != active $act - churned $churn")
      }
    }
  }

  test("rate anomaly: planted 3.5x spike flagged, calendar-exact baseline") {
    // type a: 10/day for days 0..6, then 35 on day 7 ->
    // ratio = 35e6 * 7 / 70 = 3.5e6 >= the 3x bar
    val aRows = for (d <- 0 to 6; i <- 0 until 10) yield
      (1000L + d * 10 + i, ts(d * Day + i), 1L, "a", 0.0)
    val aSpike = (0 until 35).map(i =>
      (2000L + i, ts(7 * Day + i), 1L, "a", 0.0))
    // type b: activity on day 0, silence, then day 20 — the trailing
    // CALENDAR window [day13..day19] is empty, so day 20 has NO
    // baseline (ratio -1, no spike); a last-7-OBSERVED-rows window
    // would have reached back to day 0 and flagged it
    val bRows = (0 until 4).map(i => (3000L + i, ts(i), 2L, "b", 0.0)) ++
      (0 until 100).map(i => (3100L + i, ts(20 * Day + i), 2L, "b", 0.0))
    val dir = eventsDir("anomaly", aRows ++ aSpike ++ bRows)
    val got = ReconOps.rateAnomaly(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5))).toMap
    assert(got(("a", "2024-01-08")) == (35L, 7L, 3500000L, true),
      s"planted spike flagged: $got")
    assert(got(("a", "2024-01-02")) == (10L, 1L, 1000000L, false),
      "steady day reads 1x against its 1-day baseline")
    assert(got(("a", "2024-01-01"))._3 == -1L, "first day has no baseline")
    assert(got(("b", "2024-01-21")) == (100L, 0L, -1L, false),
      "empty calendar window -> no baseline, never a spike vs stale history")
  }

  test("transitions: per-user adjacency, ppm normalizes per prev state") {
    val dir = eventsDir("trans", Seq(
      // u1: a -> b -> a; u2: a -> a; u3 has a single event (no pair)
      (1L, ts(0), 1L, "a", 0.0),
      (2L, ts(10), 1L, "b", 0.0),
      (3L, ts(20), 1L, "a", 0.0),
      (4L, ts(0), 2L, "a", 0.0),
      (5L, ts(5), 2L, "a", 0.0),
      (6L, ts(0), 3L, "b", 0.0)))
    val got = ReconOps.eventTransitions(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    assert(got == Map(
      ("a", "b") -> (1L, 500000L),
      ("a", "a") -> (1L, 500000L),
      ("b", "a") -> (1L, 1000000L)), s"$got")
    // equal timestamps order by event_id — the pair is deterministic
    val tie = eventsDir("transtie", Seq(
      (7L, ts(0), 4L, "x", 0.0), (8L, ts(0), 4L, "y", 0.0)))
    assert(ReconOps.eventTransitions(spark, tie).collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq == Seq(("x", "y")))
  }

  test("homoglyph dedup: spoofed twins fold together, unfoldable stay raw") {
    val dir = "/tmp/graft_homoglyph_spec"
    Seq((1L, "spark compute", "en", "s", 13L),
        (2L, "zzz", "en", "s", 3L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = graft.operators.TextOps.homoglyphDedup(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getBoolean(3))).toMap
    // doc 1 ("spark compute" holds a/c/e/o/p): clean id 2 + spoof id 3
    // share one fold group with TWO raw forms; doc 2 ("zzz") spoofs to
    // itself — one group, one raw form, nothing for folding to do
    assert(got == Map(2L -> (2L, 2L, true), 4L -> (2L, 1L, false)), s"$got")
  }

  test("scd2 intervals: consecutive same-type runs collapse, open tail") {
    // u0: click click view click -> 3 islands; the middle run break
    // and the open current interval are the semantics under test
    val dir = eventsDir("scd2", Seq(
      (1L, ts(0), 0L, "click", 0.0),
      (2L, ts(Hour), 0L, "click", 0.0),
      (3L, ts(2 * Hour), 0L, "view", 0.0),
      (4L, ts(3 * Hour), 0L, "click", 0.0)))
    val rows = graft.operators.ReconOps.scd2Intervals(spark, dir)
      .orderBy(col("island")).collect()
      .map(r => (r.getLong(1), r.getString(2), r.getString(3),
        Option(r.getString(4)), r.getLong(5)))
    assert(rows.toSeq == Seq(
      (1L, "click", "2024-01-01 00:00:00", Some("2024-01-01 02:00:00"), 2L),
      (2L, "view", "2024-01-01 02:00:00", Some("2024-01-01 03:00:00"), 1L),
      (3L, "click", "2024-01-01 03:00:00", None, 1L)),
      s"got: ${rows.toSeq}")
  }

  test("gap fill: calendar spine completes, gaps carry the last type " +
      "forward with zero counts") {
    // user 0 (mod-selected): active day 0 (click then view), silent
    // days 1-2, active day 3 (error). Spine must run 4 days.
    val dir = eventsDir("gapfill", Seq(
      (1L, ts(0), 0L, "click", 0.0),
      (2L, ts(Hour), 0L, "view", 0.0), // later same day: carried type
      (3L, ts(3 * Day), 0L, "error", 0.0)))
    val rows = graft.operators.ReconOps.gapFill(spark, dir)
      .collect().map(r => r.getString(1) ->
        (r.getLong(2), r.getString(3), r.getBoolean(4))).toMap
    assert(rows.size == 4, s"spine spans min..max day: $rows")
    assert(rows("2024-01-01") == (2L, "view", false),
      "day's carried type is the LAST event that day")
    assert(rows("2024-01-02") == (0L, "view", true), "gap carries forward")
    assert(rows("2024-01-03") == (0L, "view", true))
    assert(rows("2024-01-04") == (1L, "error", false))
  }
}
