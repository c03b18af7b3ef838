package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** COUNT-MIN SKETCH (Cormode & Muthukrishnan 2005) — the point-frequency
  * member of the sketch family beside KMV (distinct), KLL (quantiles) and
  * Misra–Gries (heavy hitters): `depth` rows of `width` counters, each
  * event incrementing one counter per row at
  * `bucket_d = xxhash64(d, x) mod width`; a point estimate is the MIN of
  * its counters — an OVERESTIMATE always (counters only add), within
  * `εN` (ε ≈ e/width) except with probability `(1/2)^depth`.
  *
  * Hash contract: row d's bucket is byte-identical to SQL
  * `pmod(xxhash64(d, x), width)` — seed chain `hashInt(d, 42)` then
  * `hashBytes(x, ·)`, the exact sequence the [[org.apache.spark.sql
  * .catalyst.expressions.XxHash64]] expression interprets — so the
  * consuming query computes token buckets as a plain codegen'd
  * projection and joins them against the sketch's exploded counters:
  * estimates are frames, never driver lookups.
  *
  * Scale shape: the buffer is a FIXED `depth·width` long array (32 KB at
  * the 4×1024 default) regardless of stream size; merge is element-wise
  * addition — a real mergeable `TypedImperativeAggregate` with map-side
  * combine, and the same partial merges serve any streaming fold.
  */
case class CmSketch(
    child: Expression,
    depth: Int,
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def prettyName: String = "graft_cm_sketch"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)

  override def createAggregationBuffer(): Array[Long] = new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String]
      var d = 0
      while (d < depth) {
        // the SQL xxhash64(d, x) chain: ints hash via hashInt, strings
        // via hashUnsafeBytes, seeds threading left to right from 42
        val seed = XXH64.hashInt(d, 42L)
        val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, seed)
        buf(d * width + java.lang.Math.floorMod(h, width.toLong).toInt) += 1L
        d += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any =
    new GenericArrayData(buf.map(x => x: Any))

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CmSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object CmSketch {
  val Depth = 4
  val Width = 1024

  def apply(c: Column): Column =
    org.apache.spark.sql.functions.call_function("graft_cm_sketch", c)

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_cm_sketch", exprs => CmSketch(exprs.head, Depth, Width), "built-in")
}
