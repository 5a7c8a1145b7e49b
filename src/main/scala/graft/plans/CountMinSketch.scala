package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Count-Min sketch over a string column as a native Catalyst
  * [[TypedImperativeAggregate]] — the point-frequency / join-size
  * estimator of the sketch family (Cormode & Muthukrishnan): d hash
  * rows × w counters, `est(x) = min_i row_i[h_i(x)]`, which can only
  * OVERestimate (collisions add, nothing subtracts). The complement of
  * the Misra-Gries summary ([[MisraGriesTopK]]): MG answers "which keys
  * are heavy" with a k-item survivor set, CM answers "how often is THIS
  * key" for any key, at fixed d·w state.
  *
  * Unlike MG, the sketch is fully DETERMINISTIC under Spark's unordered
  * partial merges — update adds 1 to d fixed buckets and merge is
  * element-wise vector addition, so the final table is independent of
  * merge order. The oracle therefore grades the ACTUAL counters (the
  * DuckDB twin recomputes every bucket sum from scratch), not a
  * contract envelope.
  *
  * Bucket hashing is the repo's md5 discipline, one digest per token:
  * row i reads hex digits [8i, 8i+8) of md5(x) — four independent
  * uniform 32-bit draws from one 128-bit digest (the minhash family's
  * slice trick), bit-identical in DuckDB as
  * `CAST('0x' || substr(md5(x), 1 + 8*i, 8) AS BIGINT) % w`. Depth is
  * therefore capped at 4; a production variant past that would chain
  * prefixed digests (or xxhash64, at the price of the oracle).
  *
  * State is d·w longs per partial buffer (8 KB at the default 4×256)
  * regardless of input size; the planner's partial aggregation ships
  * one buffer per partition. */
case class CountMinSketch(
    child: Expression,
    depth: Int,
    width: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]]
    with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string argument, got " +
          child.dataType.catalogString)
    else if (depth < 1 || depth > 4 || width < 1)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires 1 <= depth <= 4 (one md5 digest holds " +
          s"four 8-hex slices) and width >= 1")
    else TypeCheckResult.TypeCheckSuccess

  override def prettyName: String = "countmin"
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](depth * width)

  override def update(b: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val buckets =
        CountMinSketch.buckets(v.asInstanceOf[UTF8String], depth, width)
      var i = 0
      while (i < depth) { b(i * width + buckets(i)) += 1L; i += 1 }
    }
    b
  }

  override def merge(b: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b.length) { b(i) += other(i); i += 1 }
    b
  }

  override def eval(b: Array[Long]): Any = new GenericArrayData(b)

  override def serialize(b: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(b.length * 8)
    b.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CountMinSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountMinSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(
      newChild: Expression): CountMinSketch = copy(child = newChild)
}

object CountMinSketch {

  /** All `depth` buckets of `s` from ONE md5 digest: row i is hex
    * digits [8i, 8i+8) = bytes [4i, 4i+4) read big-endian, mod w —
    * the md5-slice idiom every cross-engine hash in this repo uses. */
  def buckets(s: UTF8String, depth: Int, width: Int): Array[Int] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val digest = md.digest(s.getBytes)
    val out = new Array[Int](depth)
    var i = 0
    while (i < depth) {
      val o = i * 4
      val v = ((digest(o) & 0xffL) << 24) | ((digest(o + 1) & 0xffL) << 16) |
        ((digest(o + 2) & 0xffL) << 8) | (digest(o + 3) & 0xffL)
      out(i) = (v % width).toInt
      i += 1
    }
    out
  }

  /** DuckDB twin of row `row` of [[buckets]] over a SQL string expr. */
  def bucketSql(row: Int, x: String, width: Int): String =
    s"(CAST('0x' || substr(md5($x), ${1 + 8 * row}, 8) AS BIGINT) % $width)"

  /** SQL-visible function name. */
  val FnName = "graft_countmin"

  /** Register (once per session) and return a Column-level handle
    * ([[DotProductLong]]'s registry + `call_function` discipline). */
  def countMin(spark: SparkSession)(c: Column, depth: Int,
      width: Int): Column = {
    val registry = spark.sessionState.functionRegistry
    val id = org.apache.spark.sql.catalyst.FunctionIdentifier(FnName)
    if (!registry.functionExists(id))
      registry.createOrReplaceTempFunction(
        FnName, exprs => {
          require(exprs.length == 3,
            s"$FnName requires (string, depth, width), got ${exprs.length}")
          def intOf(e: Expression, what: String): Int =
            if (e.foldable) e.eval() match {
              case i: Int => i
              case l: Long => l.toInt
              case other => throw new IllegalArgumentException(
                s"$FnName $what must be an integer literal, got $other")
            } else throw new IllegalArgumentException(
              s"$FnName $what must be foldable")
          CountMinSketch(exprs.head, intOf(exprs(1), "depth"),
            intOf(exprs(2), "width"))
        }, "scala_udf")
    call_function(FnName, c, lit(depth), lit(width))
  }
}
