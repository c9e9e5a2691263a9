package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** `l2_sq(array<long>, array<long>) → long` — squared Euclidean distance
  * between two integer-quantized vectors, as a native codegen'd Catalyst
  * expression (same preference order as [[CosineSim]]: a fused Expression
  * beats HOFs beats a UDF).
  *
  * Why integer: the k-means operator (graft.similarity.KMeans) does ALL its
  * arithmetic on 1e6-quantized BIGINT vectors so that centroid sums are
  * order-free and the DuckDB oracle reproduces every iteration bit-for-bit
  * (see core/Portable.scala for the same trick on money sums). The distance
  * is then exact 64-bit arithmetic: |q| ≤ ~1e7 ⇒ each squared term ≤ ~4e14,
  * and a 64-dim sum ≤ ~3e16 ≪ 2^63 — no overflow for any realistic
  * embedding scale.
  *
  * Semantics match the HOF formulation
  * `aggregate(zip_with(a, b, (x,y) -> (x-y)*(x-y)), 0L, (s,v) -> s+v)`:
  * length mismatch → NULL, NULL element → NULL.
  *
  * Scale notes: in Lloyd's assignment this runs k times per row inside
  * WholeStageCodegen with the centroid side a foldable literal — the scan
  * stays one codegen span, rows never shuffle for assignment.
  */
case class L2Sq(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = LongType

  // NULL on length mismatch even when both inputs are non-nullable
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"l2_sq expects array<bigint> inputs, got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    var s = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val d = x.getLong(i) - y.getLong(i)
      s += d * d
      i += 1
    }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
      s"""
        if ($a.numElements() != $b.numElements()) {
          ${ev.isNull} = true;
        } else {
          int $n = $a.numElements();
          long $s = 0L;
          for (int $i = 0; $i < $n; $i++) {
            if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
            long $d = $a.getLong($i) - $b.getLong($i);
            $s += $d * $d;
          }
          if (!${ev.isNull}) { ${ev.value} = $s; }
        }
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): L2Sq =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "l2_sq"
}
