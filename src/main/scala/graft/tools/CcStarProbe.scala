package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.DedupOps

/** Hot-star probe for connected components (VERDICT r12 item 5): a
  * boilerplate mega-group at 100 TB is a star whose hub feeds its whole
  * degree into ONE reducer of the min-label loop's adj ⋈ labels join.
  * This probe builds a star-dominated edge list (one hub owning `frac`
  * of all edges, the rest uniform pairs), times the plain and salted
  * variants at 1× and 8×, and prints the growth ratios — the salted
  * loop's hub partition is 1/saltFactor the plain loop's, so its 8×
  * growth must stay ~linear while the plain loop's hub task serializes.
  *
  *   sbt "runMain graft.tools.CcStarProbe [edges1x] [reps] [hubPct]"
  */
object CcStarProbe {
  def main(args: Array[String]): Unit = {
    val base = args.headOption.map(_.toLong).getOrElse(200000L)
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val hubPct = args.lift(2).map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // 10% of edges on one hub (id 0), the rest disjoint-ish pairs far
    // from the hub id space; localCheckpoint so generation cost never
    // contaminates the timings
    def starEdges(nEdges: Long) = {
      val hubEdges = nEdges * hubPct / 100
      val hub = spark.range(hubEdges)
        .select(lit(0L).as("id_a"), (col("id") + 1000000000L).as("id_b"))
      val rest = spark.range(nEdges - hubEdges)
        .select((col("id") * 2 + 1).as("id_a"), (col("id") * 2 + 2).as("id_b"))
      hub.union(rest).localCheckpoint(true)
    }

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    val results = for (scale <- Seq(1L, 8L)) yield {
      val edges = starEdges(base * scale)
      val plain = (1 to reps)
        .map(_ => time(DedupOps.connectedComponents(edges)
          .write.format("noop").mode("overwrite").save())).min
      val salted = (1 to reps)
        .map(_ => time(DedupOps.connectedComponentsSalted(edges)
          .write.format("noop").mode("overwrite").save())).min
      println(f"[ccstar] scale=${scale}x edges=${base * scale} " +
        f"plain=$plain%.2fs salted=$salted%.2fs")
      (scale, plain, salted)
    }
    val (_, p1, s1) = results.head
    val (_, p8, s8) = results.last
    println(f"[ccstar] growth 1x->8x: plain=${p8 / p1}%.2fx " +
      f"salted=${s8 / s1}%.2fx (linear = 8x / executor-divided)")
    spark.stop()
  }
}
