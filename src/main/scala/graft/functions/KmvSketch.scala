package graft.functions

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** K-Minimum-Values distinct sketch: aggregates a (hash-valued) string
  * column into the sorted set of its K smallest distinct values.
  *
  * The classic bounded-memory approximate-distinct sketch (Bar-Yossef et
  * al. 2002): with uniform hashes, `D̂ = (K−1)/h₍K₎` where `h₍K₎` is the
  * K-th smallest hash normalized to [0,1). Chosen over HLL here because it
  * is DETERMINISTIC given the hash column — feed it `md5(x)` and any
  * engine (the DuckDB oracle included) reproduces the identical sketch,
  * so the estimate is exact-comparable, which `approx_count_distinct`'s
  * engine-specific HLL never is.
  *
  * Scale shape: the buffer is a bounded TreeSet (≤ K strings); partial
  * aggregation works (merge = union-then-trim), so map-side combine keeps
  * the shuffle at K rows per group per partition — this is a real
  * `TypedImperativeAggregate`, not a `collect_set` that hauls every
  * distinct value to one place.
  */
case class KmvSketch(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[String]] {

  override def prettyName: String = "graft_kmv_sketch"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)

  override def createAggregationBuffer(): java.util.TreeSet[String] =
    new java.util.TreeSet[String]()

  private def trim(buf: java.util.TreeSet[String]): Unit =
    while (buf.size > k) buf.pollLast()

  override def update(buf: java.util.TreeSet[String], input: InternalRow): java.util.TreeSet[String] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String].toString
      // skip values already above the current K-th minimum
      if (buf.size < k || s < buf.last()) { buf.add(s); trim(buf) }
    }
    buf
  }

  override def merge(a: java.util.TreeSet[String], b: java.util.TreeSet[String]): java.util.TreeSet[String] = {
    a.addAll(b); trim(a); a
  }

  override def eval(buf: java.util.TreeSet[String]): Any = {
    val arr = new Array[Any](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { arr(i) = UTF8String.fromString(it.next()); i += 1 }
    new GenericArrayData(arr)
  }

  // length-prefixed (never delimiter-based: the function is injected as
  // general SQL, so input strings may contain any byte — a separator char
  // would split them on the serde round-trip and corrupt the sketch)
  override def serialize(buf: java.util.TreeSet[String]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) {
      val b = it.next().getBytes(StandardCharsets.UTF_8)
      out.writeInt(b.length)
      out.write(b)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[String] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val buf = new java.util.TreeSet[String]()
    var n = in.readInt()
    while (n > 0) {
      val b = new Array[Byte](in.readInt())
      in.readFully(b)
      buf.add(new String(b, StandardCharsets.UTF_8))
      n -= 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object KmvSketch {
  val DefaultK = 64

  def apply(c: Column): Column =
    org.apache.spark.sql.functions.call_function("graft_kmv_sketch", c)

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_kmv_sketch", exprs => KmvSketch(exprs.head, DefaultK), "built-in")
}
