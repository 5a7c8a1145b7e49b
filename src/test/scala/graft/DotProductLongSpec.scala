package graft

import graft.plans.DotProductLong
import org.apache.spark.sql.functions._

class DotProductLongSpec extends SparkSpec {
  import spark.implicits._

  private lazy val dot = DotProductLong.dotLong(spark) _

  test("dot product, unequal lengths use common prefix, empty is zero") {
    val df = Seq(
      (Array(1L, 2L, 3L), Array(4L, 5L, 6L), 32L),
      (Array(1L, 2L, 3L), Array(10L), 10L),
      (Array.empty[Long], Array(1L, 2L), 0L)
    ).toDF("a", "b", "want")
    assert(df.where(dot($"a", $"b") =!= $"want").count() == 0)
  }

  test("null propagation and negative values") {
    val df = Seq((Array(-2L, 3L), Array(5L, -7L))).toDF("a", "b")
    assert(df.select(dot($"a", $"b")).head().getLong(0) == -31L)
    val withNull = Seq((Array(1L), null: Array[Long])).toDF("a", "b")
    assert(withNull.select(dot($"a", $"b")).head().isNullAt(0))
  }

  test("SQL surface: graft_dot_long callable from spark.sql") {
    DotProductLong.dotLong(spark)($"x", $"x") // ensure registered
    val got = spark.sql(
      "SELECT graft_dot_long(array(1L, 2L, 3L), array(4L, 5L, 6L)) AS d")
      .head().getLong(0)
    assert(got == 32L)
  }

  test("GraftExtensions injects the function at session build time") {
    // the config-driven path (spark.sql.extensions=graft.GraftExtensions)
    // applies at session creation, which a shared-session suite cannot
    // exercise; pin the injection itself — it must register cleanly into
    // a fresh extensions container
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new graft.GraftExtensions().apply(ext) // throws on malformed injection
  }

  test("interpreted path (eval) matches codegen path") {
    val df = Seq((Array(7L, -9L, 11L), Array(2L, 3L, 5L))).toDF("a", "b")
    val viaCodegen = df.select(dot($"a", $"b")).head().getLong(0)
    val expr = graft.plans.DotProductLong(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array(7L, -9L, 11L), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.LongType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array(2L, 3L, 5L), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.LongType)))
    assert(expr.eval(null) == viaCodegen)
  }
}
