package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Native SimHash signature: `array<string>` shingles → the 64-bit SimHash
  * packed into ONE `long` (bit j set iff the per-bit ±1 counter over all
  * shingle hashes is positive).
  *
  * The declarative route (explode → xxhash64 → 64 conditional SUMs →
  * re-pack) is a full shuffle of |docs|·|shingles| rows plus a 64-column
  * aggregate; this expression folds the whole signature per row inside
  * whole-stage codegen — one pass over the shingle array, no shuffle.
  * Hash family is the same XXH64 core Spark's `xxhash64` uses.
  *
  * A single long (vs. an array of chunk values) keeps the LSH band join
  * payload at 2 longs per side and makes the in-join hamming prefilter one
  * `bit_count(a ^ b)` — band values are recovered with shift/mask.
  */
case class Simhash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash64"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val cnt = new Array[Int](64)
    var i = 0
    while (i < arr.numElements()) {
      val s = arr.getUTF8String(i)
      if (s != null) { // null shingles contribute nothing (like built-ins)
        val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
        var j = 0
        while (j < 64) {
          cnt(j) += (if (((h >>> j) & 1L) == 1L) 1 else -1)
          j += 1
        }
      }
      i += 1
    }
    Simhash64.pack(cnt)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val cnt = ctx.freshName("cnt")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val s = ctx.freshName("s")
      val xxh = classOf[XXH64].getName
      s"""
         |int[] $cnt = new int[64];
         |for (int $i = 0; $i < $arr.numElements(); $i++) {
         |  org.apache.spark.unsafe.types.UTF8String $s = $arr.getUTF8String($i);
         |  if ($s != null) {
         |    long $h = $xxh.hashUnsafeBytes($s.getBaseObject(), $s.getBaseOffset(), $s.numBytes(), 42L);
         |    for (int $j = 0; $j < 64; $j++) {
         |      $cnt[$j] += ((($h >>> $j) & 1L) == 1L) ? 1 : -1;
         |    }
         |  }
         |}
         |${ev.value} = ${classOf[Simhash64].getName}.pack($cnt);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Simhash64 {

  /** Pack 64 bit-counters into the signature long (bit set iff counter > 0). */
  def pack(cnt: Array[Int]): Long = {
    var v = 0L
    var j = 0
    while (j < 64) {
      if (cnt(j) > 0) v |= (1L << j)
      j += 1
    }
    v
  }

  def apply(c: Column): Column = {
    // reuse the registry plumbing VectorExprs established
    org.apache.spark.sql.functions.call_function("graft_simhash64", c)
  }

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_simhash64", exprs => Simhash64(exprs.head), "built-in")
}
