package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native SimHash signature: `array<string>` shingles → `array<long>` of
  * [[SimhashChunks.NumChunks]] chunk values ([[SimhashChunks.ChunkBits]]
  * bits each) of the 64-bit SimHash.
  *
  * The declarative route (explode → xxhash64 → 64 conditional SUMs →
  * re-pack) is a full shuffle of |docs|·|shingles| rows plus a 64-column
  * aggregate; this expression folds the whole signature per row inside
  * whole-stage codegen — one pass over the shingle array, no shuffle.
  * Hash family is the same XXH64 core Spark's `xxhash64` uses.
  */
case class SimhashChunks(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_simhash_chunks"

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
    new GenericArrayData(SimhashChunks.pack(cnt))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val cnt = ctx.freshName("cnt")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val s = ctx.freshName("s")
      val chunks = ctx.freshName("chunks")
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
         |long[] $chunks = ${classOf[SimhashChunks].getName}.pack($cnt);
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($chunks);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimhashChunks {
  val NumChunks = 16
  val ChunkBits = 64 / NumChunks

  /** Pack 64 bit-counters into chunk values (bit set iff counter > 0). */
  def pack(cnt: Array[Int]): Array[Long] = {
    val chunks = new Array[Long](NumChunks)
    var c = 0
    while (c < NumChunks) {
      var v = 0L
      var k = 0
      while (k < ChunkBits) {
        if (cnt(c * ChunkBits + k) > 0) v |= (1L << k)
        k += 1
      }
      chunks(c) = v
      c += 1
    }
    chunks
  }

  def apply(c: Column): Column = {
    // reuse the registry plumbing VectorExprs established
    org.apache.spark.sql.functions.call_function("graft_simhash_chunks", c)
  }

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_simhash_chunks", exprs => SimhashChunks(exprs.head), "built-in")
}
