package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType}

/** Distributed Bloom filter build + membership test.
  *
  * The reference has nothing like this (its joins buffer both sides in
  * operator state — SURVEY §2.4); at 100 TB the dominant join cost is
  * shuffling the big probe side, most of which will not survive the join
  * when the build side is selective. A Bloom filter built over the build
  * side's keys and broadcast into a probe-side `WHERE might_contain(...)`
  * drops non-joining rows BEFORE the exchange — the semi-join-reduction
  * pattern Spark's own AQE runtime row-level filters apply, exposed here
  * as first-class, oracle-checkable algebra (false positives are removed
  * by the exact join that follows, so results are bit-exact).
  *
  * Scale shape: the buffer is a fixed `Array[Long]` bitset (m/64 words;
  * the 2²⁰-bit default holds ~5×10⁴ keys at fp≈3×10⁻⁵ with k=5 — size m
  * to ~20 bits/key for the build side at hand). Partial
  * aggregation works (merge = bitwise OR), so map-side combine ships one
  * bitset per partition, never the keys. The built filter is one bounded
  * row collected to the driver and re-broadcast as a literal — the same
  * ship-a-small-summary motion as Spark's `InSubqueryExec` runtime filter.
  */
case class BloomBuildAgg(
    child: Expression,
    numBits: Int = BloomFilterOps.DefaultBits,
    numHashes: Int = BloomFilterOps.DefaultHashes,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(numBits > 0 && numBits % 64 == 0, "numBits must be a positive multiple of 64")

  override def prettyName: String = "graft_bloom_agg"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName takes a BIGINT key, got ${child.dataType.sql}")

  override def createAggregationBuffer(): Array[Long] = new Array[Long](numBits / 64)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) BloomFilterOps.add(buf, v.asInstanceOf[Long], numHashes)
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) |= b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = BloomFilterOps.toBytes(buf, numHashes)

  override def serialize(buf: Array[Long]): Array[Byte] = BloomFilterOps.toBytes(buf, numHashes)

  override def deserialize(bytes: Array[Byte]): Array[Long] = BloomFilterOps.words(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomBuildAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomBuildAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** `graft_bloom_contains(filter, key)` — codegen'd probe against a built
  * filter (normally a literal, so the byte array is materialized once per
  * task, inside whole-stage codegen).
  */
case class BloomMightContain(left: Expression, right: Expression)
  extends BinaryExpression {

  override def prettyName: String = "graft_bloom_contains"
  override def dataType: DataType = BooleanType
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName takes (BINARY, BIGINT), got (${left.dataType.sql}, ${right.dataType.sql})")

  override protected def nullSafeEval(filter: Any, key: Any): Any =
    BloomFilterOps.mightContain(filter.asInstanceOf[Array[Byte]], key.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (f, k) =>
      s"${ev.value} = graft.functions.BloomFilterOps.mightContain($f, $k);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Bit-level plumbing, static so generated code can call it directly.
  *
  * Self-describing wire format: `[int32 k][int32 nWords][long words…]`,
  * big-endian — the probe side needs no out-of-band config. Double
  * hashing (Kirsch–Mitzenmacher 2006): two splitmix64 finalizations give
  * `g_i = h1 + i·h2`, which preserves the asymptotic false-positive rate
  * of k independent hashes.
  */
object BloomFilterOps {
  val DefaultBits: Int = 1 << 20
  val DefaultHashes: Int = 5

  private def mix(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  def add(words: Array[Long], v: Long, k: Int): Unit = {
    val nBits = words.length.toLong * 64
    val h1 = mix(v)
    val h2 = mix(v ^ 0x6A09E667F3BCC909L) | 1L
    var i = 0
    while (i < k) {
      val bit = java.lang.Long.remainderUnsigned(h1 + i * h2, nBits)
      words((bit >>> 6).toInt) |= (1L << (bit & 63))
      i += 1
    }
  }

  def toBytes(words: Array[Long], k: Int): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 + words.length * 8)
    bb.putInt(k).putInt(words.length)
    words.foreach(bb.putLong)
    bb.array()
  }

  def words(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    bb.getInt() // k
    val out = new Array[Long](bb.getInt())
    var i = 0
    while (i < out.length) { out(i) = bb.getLong(); i += 1 }
    out
  }

  // called from generated code — keep the signature (byte[], long)
  def mightContain(bytes: Array[Byte], v: Long): Boolean = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val k = bb.getInt()
    val nWords = bb.getInt()
    val nBits = nWords.toLong * 64
    val h1 = mix(v)
    val h2 = mix(v ^ 0x6A09E667F3BCC909L) | 1L
    var i = 0
    while (i < k) {
      val bit = java.lang.Long.remainderUnsigned(h1 + i * h2, nBits)
      if ((bb.getLong(8 + ((bit >>> 6).toInt << 3)) & (1L << (bit & 63))) == 0L) return false
      i += 1
    }
    true
  }
}

object BloomFilter {
  /** Aggregate a long key column into a serialized Bloom filter. */
  def bloomAgg(key: Column): Column = call_function("graft_bloom_agg", key)

  /** Membership probe, usable as a pushed-down row filter. */
  def mightContain(filter: Column, key: Column): Column =
    call_function("graft_bloom_contains", filter, key)

  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_bloom_agg", exprs => BloomBuildAgg(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_bloom_contains", exprs => BloomMightContain(exprs(0), exprs(1)), "built-in")
  }
}
