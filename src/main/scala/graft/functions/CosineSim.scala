package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType, FloatType, ArrayType}

/** Cosine similarity between two numeric vectors as ONE tight loop per
  * row — the hot inner kernel of brute-force and bucketed ANN search.
  *
  * The composable alternative (`aggregate(zip_with(a, b, …))`) builds
  * an intermediate array and evaluates interpreted lambda calls per
  * element; on a 128-d crossJoin that interpreter overhead dominates
  * end-to-end time by >10×. This expression does the dot product and
  * both norms in a single index-ordered pass (index order keeps results
  * bit-identical to the DuckDB oracle's accumulation).
  *
  * Accepts array<float> or array<double>; accumulates in double.
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    val af = isFloat(left); val bf = isFloat(right)
    var dot = 0d; var na = 0d; var nb = 0d
    var i = 0
    while (i < n) {
      val x = if (af) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bf) b.getFloat(i).toDouble else b.getDouble(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0d || nb == 0d) java.lang.Double.valueOf(0d)
    else java.lang.Double.valueOf(dot / (math.sqrt(na) * math.sqrt(nb)))
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSim =
    copy(left = l, right = r)
}
