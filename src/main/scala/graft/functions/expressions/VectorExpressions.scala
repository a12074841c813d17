package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Custom codegen'd Catalyst expressions for the vector/set hot paths
  * (SURVEY §4.3's sanctioned "custom Expression, perf only" tier).
  *
  * Why not `aggregate`/`zip_with`: Spark's higher-order functions
  * evaluate their lambda per element through the INTERPRETED expression
  * evaluator (HigherOrderFunction is CodegenFallback), which measured
  * ~5× slower than a fused loop on the 64-dim embedding benchmarks —
  * and they force an up-front `transform(_.cast(double))` copy of every
  * array. These expressions generate a single tight Java loop inside
  * whole-stage codegen and read float arrays directly.
  *
  * Semantics match the higher-order-function forms bit-for-bit:
  * left-to-right summation in float64, each float element promoted to
  * double before multiply — identical to the DuckDB oracle's
  * `list_dot_product(list_transform(e, x -> CAST(x AS DOUBLE)), …)`.
  * Array elements must be non-null (embedding vectors; enforced by the
  * source schema).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  // no ExpectsInputTypes (AbstractDataType is private[sql]); inputs are
  // library-internal and must be array<float|double>, checked here
  override def dataType: DataType = DoubleType

  // NULL on length mismatch (below), even for non-null inputs
  override def nullable: Boolean = true

  private def elemIsFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case other => throw new IllegalArgumentException(
      s"DotProduct requires array<float|double>, got $other")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    // Length mismatch → NULL, matching the HOF form (zip_with pads the
    // shorter array with nulls, so the aggregate sum goes null): a
    // malformed embedding must surface as a visible NULL, never a
    // plausible partial dot product.
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    val lf = elemIsFloat(left)
    val rf = elemIsFloat(right)
    var s = 0.0
    var i = 0
    while (i < n) {
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      s += xv * yv
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val lGet = if (elemIsFloat(left)) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      val rGet = if (elemIsFloat(right)) s"(double) $b.getFloat($i)" else s"$b.getDouble($i)"
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  final int $n = $a.numElements();
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $s += ($lGet) * ($rGet);
         |  }
         |  ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** |A ∩ B| for two SORTED long arrays via a merge walk — the exact
  * Jaccard verification kernel. O(|A|+|B|) per pair with no per-element
  * lambda dispatch and no explode/join fan-out: the alternative
  * (routing every candidate pair back through a per-shingle equi-join)
  * shuffles Σ_pairs |A| rows, ~50× the bytes at bench scale.
  * Inputs MUST be duplicate-free and ascending (collect_list of a
  * distinct set through sort_array).
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    var i = 0
    var j = 0
    var c = 0L
    while (i < x.numElements() && j < y.numElements()) {
      val xv = x.getLong(i)
      val yv = y.getLong(j)
      if (xv == yv) { c += 1; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |int $i = 0; int $j = 0; long $c = 0L;
         |while ($i < $a.numElements() && $j < $b.numElements()) {
         |  final long $xv = $a.getLong($i);
         |  final long $yv = $b.getLong($j);
         |  if ($xv == $yv) { $c++; $i++; $j++; }
         |  else if ($xv < $yv) { $i++; } else { $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}
