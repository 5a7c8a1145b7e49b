package graft

import org.apache.spark.sql.functions._
import graft.operators.FuzzyOps

/** [[graft.operators.FuzzyOps]] — deletion-neighborhood entity
  * resolution. Oracled rows: q_fuzzy_pairs/q_fuzzy_census; this pins
  * the completeness claim (every edit type at dist 1 is caught) and
  * the planted-recall floor. */
class FuzzyOpsSpec extends SparkSpec {
  import spark.implicits._

  // the declared pipeline minus the corpus fixture: resolve dist-1
  // pairs over hand-built records through the same key + verify chain
  private def resolve(recs: (Long, String)*) = {
    val df = recs.toSeq.toDF("id", "name")
    val keys = df.withColumn("k", explode(concat(array(col("name")),
      transform(sequence(lit(1), length(col("name"))), p =>
        concat(col("name").substr(lit(1), p - 1),
          col("name").substr(p + 1, length(col("name"))))))))
    val a = keys.select(col("id").as("id_a"), col("name").as("name_a"),
      col("k"))
    val b = keys.select(col("id").as("id_b"), col("name").as("name_b"),
      col("k"))
    a.join(b, Seq("k")).where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("name_a"), col("name_b"))
      .distinct()
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")))
      .where(col("dist") === 1)
      .select(col("id_a"), col("id_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("every dist-1 edit type is caught: substitution, insertion, deletion") {
    val found = resolve(
      (1L, "martha jones"),
      (2L, "marsha jones"), // substitution vs 1
      (3L, "marthaa jones"), // insertion vs 1
      (4L, "marth jones"), // deletion vs 1
      (5L, "martha stone")) // dist 2 vs 1: must NOT pair with 1
    assert(found.contains((1L, 2L)))
    assert(found.contains((1L, 3L)))
    assert(found.contains((1L, 4L)))
    assert(!found.contains((1L, 5L)), "dist-2 is out of the neighborhood")
  }

  test("exact duplicates are excluded (dist 0 is exact dedup's business)") {
    val found = resolve((1L, "same name"), (2L, "same name"))
    assert(found.isEmpty)
  }

  test("declared census: the deletion neighborhood is complete — every " +
      "planted twin is recovered") {
    val row = FuzzyOps.fuzzyCensus(spark, sfDir).head()
    val (nPairs, found, planted) =
      (row.getAs[Long]("n_pairs"), row.getAs[Long]("n_planted_found"),
        row.getAs[Long]("n_planted"))
    assert(planted > 0)
    assert(found == planted,
      s"completeness: found $found of $planted planted twins")
    assert(nPairs >= planted, "organic dist-1 pairs may add to the census")
  }
}
