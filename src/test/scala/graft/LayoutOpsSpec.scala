package graft

import org.apache.spark.sql.functions._
import graft.operators.LayoutOps

/** [[graft.operators.LayoutOps]] — Z-order layout for 2-D data
  * skipping. The oracled rows are q_zorder/q_zorder_layout/
  * q_zorder_skipping; this pins the interleave math, the tile
  * property, and the payoff claim the family exists for. */
class LayoutOpsSpec extends SparkSpec {

  test("bit interleave: known values, bijective over the 16x16 grid") {
    // reference Morton pairs (4-bit): (x=0b0011, y=0b0001) ->
    // bits x0->0, y0->1, x1->2: z = 1 + 2 + 4 = 7
    val df = spark.range(1).selectExpr(
      s"CAST(${zInterleave("3", "1")} AS INT) AS a",
      s"CAST(${zInterleave("0", "0")} AS INT) AS b",
      s"CAST(${zInterleave("15", "15")} AS INT) AS c")
    val r = df.head()
    assert(r.getInt(0) == 7)
    assert(r.getInt(1) == 0)
    assert(r.getInt(2) == 255)
    // bijectivity: all 256 (x, y) pairs produce 256 distinct z values
    val n = spark.range(256).selectExpr(
        "CAST(id % 16 AS INT) AS x", "CAST(id div 16 AS INT) AS y")
      .selectExpr(s"CAST(${zInterleave("x", "y")} AS INT) AS z")
      .distinct().count()
    assert(n == 256L)
  }

  private def zInterleave(x: String, y: String): String =
    (0 until 4).map { i =>
      s"((($x >> $i) & 1) << ${2 * i}) + ((($y >> $i) & 1) << ${2 * i + 1})"
    }.mkString("(", " + ", ")")

  test("census: every z value is a single (x, y) cell") {
    val census = LayoutOps.zorderCensus(spark, sfDir)
    assert(census.where(col("min_x") =!= col("max_x") ||
      col("min_y") =!= col("max_y")).isEmpty,
      "a z value must map to exactly one tile cell")
    assert(census.count() > 0)
  }

  test("layout census: files partition the corpus, z-files are tiles") {
    val layout = LayoutOps.zorderLayout(spark, sfDir)
    val byLayout = layout.groupBy(col("layout"))
      .agg(sum(col("n_rows")).as("tot"), count(lit(1)).as("nf"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    val total = graft.sources.Tables.events(spark, sfDir).count()
    assert(byLayout("zorder")._1 == total, "z layout loses/dups rows")
    assert(byLayout("linear")._1 == total, "linear layout loses/dups rows")
    assert(byLayout("zorder")._2 <= LayoutOps.NFiles)
    // shape property: linear stripes span the FULL x range (they bound
    // only time), while every tile-aligned z file bounds x strictly
    // narrower — the two-dimensional tightness skipping rests on
    val xExtent = col("max_x") - col("min_x") + 1
    val worstX = layout.groupBy(col("layout"))
      .agg(max(xExtent).cast("long").as("wx"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(worstX("linear") > LayoutOps.Buckets.toLong / 2,
      s"a time stripe spans (nearly) all user buckets: $worstX")
    assert(worstX("zorder") <= LayoutOps.Buckets.toLong / 2,
      s"tile-aligned z files bound x to at most half the range: $worstX")
    assert(worstX("zorder") < worstX("linear"), s"z must be tighter: $worstX")
  }

  test("skipping payoff: the 2-D predicate touches no more files " +
      "under z-order than under the linear layout") {
    val rows = LayoutOps.zorderSkipping(spark, sfDir)
      .collect().map(r => r.getAs[String]("layout") ->
        (r.getAs[Long]("n_files"), r.getAs[Long]("candidate_files"),
          r.getAs[Long]("matched_rows"))).toMap
    val (zn, zc, zm) = rows("zorder")
    val (ln, lc, lm) = rows("linear")
    assert(zm == lm, "matched rows are layout-independent")
    assert(zc <= lc, s"z-order must not skip worse: z=$zc linear=$lc")
    assert(zc >= 1 && zc <= zn)
    // the payoff is real on this corpus: strictly fewer candidates
    assert(zc < lc, s"expected strict win on the events corpus: $rows")
  }

  test("incremental maintenance: appends degrade the recent-window " +
      "payoff, the rewrite restores it, the trigger fires") {
    import spark.implicits._
    // the full 16x16 grid, one row per cell: base = y < 13 (the
    // original layout's world), appends = y 13..15 (three later
    // batches). Append files are lin(=arrival)-keyed, so each is one
    // x-WIDE time stripe — exactly the decay mode a z-ordered table
    // suffers under daily appends.
    val keyed = (0 until 256).map { i =>
      val x = i % 16; val y = i / 16
      val z = (0 until 4).map(b =>
        (((x >> b) & 1) << (2 * b)) + (((y >> b) & 1) << (2 * b + 1))).sum
      (i.toLong, x, y, z, y * 16 + x)
    }.toDF("event_id", "x", "y", "z", "lin")
    val got = LayoutOps.zorderIncrementalOf(keyed).collect()
      .map(r => r.getAs[String]("phase") -> r).toMap
    assert(got.keySet == Set("base", "appended", "optimized"))
    // optimized: uniform grid -> 16 tile files, the recent window
    // (x 4..7, y 12..15) is exactly one tile
    assert(got("optimized").getAs[Long]("n_files") == 16L)
    assert(got("optimized").getAs[Long]("candidate_files") == 1L)
    assert(got("optimized").getAs[Long]("sum_box_area") == 256L)
    // appended: the three x-wide append stripes are ALL candidates
    // (plus any y=12 base files) — strictly worse than the rewrite
    val appCand = got("appended").getAs[Long]("candidate_files")
    assert(appCand > got("optimized").getAs[Long]("candidate_files"),
      s"append stripes must degrade the recent-window payoff: $appCand")
    assert(got("appended").getAs[Long]("n_files") ==
      got("base").getAs[Long]("n_files") + LayoutOps.NAppendFiles)
    // the maintenance decision is measured, and fires here
    assert(got.values.forall(_.getAs[Boolean]("triggered")))
    assert(got.values.forall(_.getAs[Long]("matched_rows") == 16L))
  }
}
