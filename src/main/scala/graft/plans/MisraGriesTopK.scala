package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries frequent-items summary over a string column, as a native
  * Catalyst [[TypedImperativeAggregate]] — the heavy-hitter primitive a
  * 100 TB pipeline uses where an exact `groupBy(tok).count` would
  * shuffle a vocabulary-sized relation just to read its head: boiler-
  * plate token detection, hot-domain censuses, skew probes on join
  * keys. State is a bounded map of at most `k` counters per partial
  * buffer (O(k) bytes regardless of input size), updated in one pass
  * and merged pairwise up the partial-aggregation tree — the planner
  * gives it map-side partial combine for free, so the shuffle carries
  * one ≤ k-entry sketch per partition instead of the vocabulary.
  *
  * Guarantees (the mergeable-summaries bound, Agarwal et al., and
  * Misra-Gries '82): after any sequence of updates and merges over a
  * stream of n items, every stored estimate UNDERCOUNTS its item's
  * true frequency by at most n/(k+1), and therefore every item with
  * true count > n/(k+1) is PRESENT in the sketch. Which k+1-counter
  * states survive for items near the bar depends on merge order (Spark
  * does not fix partial-merge order), so the oracle-gated query
  * ([[graft.operators.TextOps.heavyHitters]]) emits the deterministic
  * CONTRACT — presence and error-bound booleans against exact counts —
  * not the raw sketch, exactly like the HLL error-bound query.
  *
  * Update is O(1) amortized: the decrement-all step uses a logical
  * offset (stored − offset = estimate) instead of rewriting k
  * counters, and evicts lazily in the same sweep that frees the slot.
  *
  * Reference scope: the reference engine has no sketch aggregates —
  * this is part of the [EXT] scale surface (SURVEY.md §2 A11's
  * approximate-accounting family).
  */
case class MisraGriesTopK(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[MisraGriesTopK.Buffer]
    with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string argument, got " +
          child.dataType.catalogString)
    else if (k < 1)
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires k >= 1, got $k")
    else TypeCheckResult.TypeCheckSuccess

  override def prettyName: String = "mg_topk"
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("tok", StringType, nullable = false),
      StructField("est", LongType, nullable = false))),
    containsNull = false)

  override def createAggregationBuffer(): MisraGriesTopK.Buffer =
    new MisraGriesTopK.Buffer

  override def update(b: MisraGriesTopK.Buffer,
      input: InternalRow): MisraGriesTopK.Buffer = {
    val v = child.eval(input)
    if (v != null) b.add(v.asInstanceOf[UTF8String], k)
    b
  }

  override def merge(b: MisraGriesTopK.Buffer,
      other: MisraGriesTopK.Buffer): MisraGriesTopK.Buffer = {
    b.mergeIn(other, k)
    b
  }

  override def eval(b: MisraGriesTopK.Buffer): Any = {
    // deterministic rendering of whatever counters survived:
    // estimate desc, then binary string order
    val entries = b.estimates.sortWith { case ((ta, ea), (tb, eb)) =>
      if (ea != eb) ea > eb else ta.compareTo(tb) < 0
    }
    new GenericArrayData(entries.map { case (tok, est) =>
      InternalRow(tok, est): Any
    })
  }

  override def serialize(b: MisraGriesTopK.Buffer): Array[Byte] = {
    val entries = b.estimates
    var size = 4
    entries.foreach { case (tok, _) => size += 4 + tok.numBytes() + 8 }
    val bb = ByteBuffer.allocate(size)
    bb.putInt(entries.length)
    entries.foreach { case (tok, est) =>
      val bytes = tok.getBytes
      bb.putInt(bytes.length)
      bb.put(bytes)
      bb.putLong(est)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): MisraGriesTopK.Buffer = {
    val bb = ByteBuffer.wrap(bytes)
    val b = new MisraGriesTopK.Buffer
    var n = bb.getInt
    while (n > 0) {
      val len = bb.getInt
      val tokBytes = new Array[Byte](len)
      bb.get(tokBytes)
      b.put(UTF8String.fromBytes(tokBytes), bb.getLong)
      n -= 1
    }
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesTopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(
      newChild: Expression): MisraGriesTopK = copy(child = newChild)
}

object MisraGriesTopK {

  /** Bounded counter map. Stored values are `estimate + offset`; the
    * classic decrement-all-by-1 step becomes `offset += 1` plus an
    * eviction sweep of entries whose stored value sank to the offset —
    * O(k) only when a slot must be freed, O(1) otherwise. */
  final class Buffer {
    private val counts = new java.util.HashMap[UTF8String, java.lang.Long]()
    private var offset = 0L

    /** Logical (token, estimate) pairs, estimate ≥ 1. */
    def estimates: Array[(UTF8String, Long)] = {
      val out = new Array[(UTF8String, Long)](counts.size())
      val it = counts.entrySet().iterator()
      var i = 0
      while (it.hasNext) {
        val e = it.next()
        out(i) = (e.getKey, e.getValue - offset)
        i += 1
      }
      out
    }

    /** Insert a logical estimate (deserialize/merge path). */
    def put(tok: UTF8String, est: Long): Unit =
      counts.put(tok, est + offset)

    def add(key: UTF8String, k: Int): Unit = {
      val cur = counts.get(key)
      if (cur != null) counts.put(key, cur + 1L)
      else if (counts.size() < k) counts.put(key.clone(), offset + 1L)
      else {
        // full and unseen: every counter (and the arriving item) -1
        offset += 1
        val it = counts.entrySet().iterator()
        while (it.hasNext) if (it.next().getValue <= offset) it.remove()
      }
    }

    /** Mergeable-summaries rule: add estimates, then subtract the
      * (k+1)-th largest combined estimate from every counter and drop
      * the non-positive — the result has ≤ k counters and the combined
      * undercount stays ≤ (n₁+n₂)/(k+1). */
    def mergeIn(other: Buffer, k: Int): Unit = {
      other.estimates.foreach { case (tok, est) =>
        val cur = counts.get(tok)
        if (cur != null) counts.put(tok, cur + est)
        else counts.put(tok, est + offset)
      }
      if (counts.size() > k) {
        val ests = new Array[Long](counts.size())
        val it = counts.values().iterator()
        var i = 0
        while (it.hasNext) { ests(i) = it.next() - offset; i += 1 }
        java.util.Arrays.sort(ests)
        // (k+1)-th largest logical estimate
        val d = ests(ests.length - 1 - k)
        offset += d
        val eit = counts.entrySet().iterator()
        while (eit.hasNext) if (eit.next().getValue <= offset) eit.remove()
      }
    }
  }

  /** SQL-visible function name (registry + `call_function`, the
    * [[DotProductLong]] version-independence discipline). */
  val FnName = "graft_mg_topk"

  /** Register (once per session) and return a Column-level handle.
    * The analyzer wraps the registry-built [[MisraGriesTopK]] in an
    * `AggregateExpression` exactly as it does every built-in aggregate,
    * so the planner gives it partial aggregation (map-side sketches,
    * one ≤ k-entry buffer per partition crossing the shuffle). */
  def mgTopK(spark: SparkSession)(c: Column, k: Int): Column = {
    val registry = spark.sessionState.functionRegistry
    val id = org.apache.spark.sql.catalyst.FunctionIdentifier(FnName)
    if (!registry.functionExists(id))
      registry.createOrReplaceTempFunction(
        FnName, exprs => {
          require(exprs.length == 2,
            s"$FnName requires (string, int k), got ${exprs.length} args")
          val kv = exprs(1) match {
            case e if e.foldable => e.eval() match {
              case i: Int => i
              case l: Long => l.toInt
              case other => throw new IllegalArgumentException(
                s"$FnName k must be an integer literal, got $other")
            }
            case _ => throw new IllegalArgumentException(
              s"$FnName k must be foldable")
          }
          MisraGriesTopK(exprs.head, kv)
        }, "scala_udf")
    call_function(FnName, c, lit(k))
  }
}
