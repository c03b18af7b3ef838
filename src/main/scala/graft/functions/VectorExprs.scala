package graft.functions

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.{call_function, sqrt}
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst vector expression (builder brief: "a native Catalyst
  * Expression (with doGenCode) beats a Scala UDF").
  *
  * The built-in route for a dot product —
  * `aggregate(zip_with(a,b,(x,y)->x*y), 0d, (acc,v)->acc+v)` — allocates an
  * intermediate array and evaluates interpreted lambdas per element
  * (higher-order functions don't participate in whole-stage codegen). For
  * pairwise similarity over millions of pairs that is the hot path;
  * [[DotProduct]] compiles to a tight primitive loop inside whole-stage
  * codegen instead. Summation order matches the sequential left fold, so
  * results are bit-identical to the HOF form and to DuckDB's
  * `list_sum(list_transform(list_zip(..)))` oracle.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    // ragged inputs are a data defect: return null (like the zip_with HOF
    // form) rather than a plausible-looking truncated dot product
    if (x.numElements() != y.numElements()) null
    else {
      val n = x.numElements()
      var s = 0.0
      var i = 0
      while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
      s
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $a.numElements(); $i++) {
         |    $s += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorExprs {

  /** Register `graft_dot` on the session (idempotent); needed before
    * [[dot]]-built plans resolve.
    */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_dot", exprs => DotProduct(exprs(0), exprs(1)), "built-in")

  /** `graft_dot(a, b)` as a Column (resolved through the registry). */
  def dot(a: Column, b: Column): Column = call_function("graft_dot", a, b)

  /** Euclidean norm. */
  def norm(a: Column): Column = sqrt(dot(a, a))
}

/** `SparkSessionExtensions` hook: engine functions at session build time via
  * `.config("spark.sql.extensions", "graft.functions.GraftExtensions")`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (exprs: Seq[Expression]) => DotProduct(exprs(0), exprs(1))))
    ext.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("graft_simhash64"),
      new ExpressionInfo(classOf[Simhash64].getName, "graft_simhash64"),
      (exprs: Seq[Expression]) => Simhash64(exprs.head)))
    ext.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("graft_kmv_sketch"),
      new ExpressionInfo(classOf[KmvSketch].getName, "graft_kmv_sketch"),
      (exprs: Seq[Expression]) => KmvSketch(exprs.head, KmvSketch.DefaultK)))
    ext.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("graft_kll_quantiles"),
      new ExpressionInfo(classOf[KllSketch].getName, "graft_kll_quantiles"),
      (exprs: Seq[Expression]) =>
        KllSketch(exprs.head, KllSketch.DefaultCapacity, KllSketch.DefaultPs)))
    ext.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("graft_bloom_agg"),
      new ExpressionInfo(classOf[BloomBuildAgg].getName, "graft_bloom_agg"),
      (exprs: Seq[Expression]) => BloomBuildAgg(exprs.head)))
    ext.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("graft_bloom_contains"),
      new ExpressionInfo(classOf[BloomMightContain].getName, "graft_bloom_contains"),
      (exprs: Seq[Expression]) => BloomMightContain(exprs(0), exprs(1))))
    ext.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("graft_nfc"),
      new ExpressionInfo(classOf[NfcNormalize].getName, "graft_nfc"),
      (exprs: Seq[Expression]) => NfcNormalize(exprs.head)))
    // pure range joins → bucketed equi-joins (opt-in via the width conf)
    ext.injectOptimizerRule(_ => graft.plans.RangeJoinBucketRule)
    // the custom TOP-K PER GROUP physical operator (partial+final heaps)
    ext.injectPlannerStrategy(_ => graft.plans.TopKPerGroupStrategy)
  }
}
