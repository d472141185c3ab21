package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Squared L2 distance between two numeric vectors as ONE tight loop
  * per row — the hot kernel of every IVF assignment
  * ([[graft.operators.IvfKmeans.withDists]]): the composable
  * `aggregate(zip_with(a, b, (x,y) -> (x-y)*(x-y)), …)` builds an
  * intermediate array and pays an interpreted lambda call per element,
  * which dominates a corpus×k crossJoin (measured ~10× end-to-end on
  * the chunk-index fit). Accumulates `(x-y)*(x-y)` in index order —
  * the exact operation/order DuckDB's `list_sum(list_transform(
  * list_zip(a, b), p -> (p[1]-p[2])*(p[1]-p[2])))` replay performs, so
  * results stay bit-identical cross-engine (the [[CosineSim]]
  * contract). Accepts array<float> or array<double>.
  *
  * Generates code (same index-order loop, same double ops — IEEE adds
  * and multiplies are deterministic, so interpreted and generated
  * paths are bit-identical) so the surrounding projection stays inside
  * whole-stage codegen: as a `CodegenFallback` every IVF assignment
  * broke the stage and boxed per row (round-15 verdict task 3). */
case class SqDist(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "sq_dist"

  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    val af = isFloat(left); val bf = isFloat(right)
    var acc = 0d
    var i = 0
    while (i < n) {
      val x = if (af) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bf) b.getFloat(i).toDouble else b.getDouble(i)
      val dxy = x - y
      acc += dxy * dxy
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val dxy = ctx.freshName("dxy")
      // element accessors resolved at codegen time from the static
      // child types — no per-element branch in the generated loop
      val getX = if (isFloat(left)) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      val getY = if (isFloat(right)) s"(double) $b.getFloat($i)" else s"$b.getDouble($i)"
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  final double $dxy = $getX - $getY;
         |  $acc += $dxy * $dxy;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): SqDist =
    copy(left = l, right = r)
}

/** Dense bucket histogram of a long-bucket array, as array<double> —
  * the one-pass form of the hashing-trick vectorizer
  * ([[graft.operators.CurationOps]] chunk embedding): the composable
  * `transform(sequence(0, dim-1), i -> size(filter(bs, b -> b = i)))`
  * costs dim × |bs| interpreted lambda calls per row; this is one
  * |bs|-length loop. Counts are exact small integers, so the double
  * widening is exact and the result is bit-identical to any
  * per-bucket-count formulation (DuckDB's list-comprehension replay
  * included). Out-of-range buckets are ignored; NULL elements are
  * skipped (the hash never produces them — defensive).
  *
  * Generates the identical loop (integer increments of exact doubles —
  * order-insensitive and bit-identical to the interpreted path) so the
  * chunk-vectorize projection stays inside whole-stage codegen. */
case class BucketCounts(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "bucket_counts"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val bs = l.asInstanceOf[ArrayData]
    val dim = r.asInstanceOf[Number].intValue()
    val counts = new Array[Double](dim)
    var i = 0
    val n = bs.numElements()
    while (i < n) {
      if (!bs.isNullAt(i)) {
        val b = bs.get(i, LongType).asInstanceOf[Long]
        if (b >= 0 && b < dim) counts(b.toInt) += 1d
      }
      i += 1
    }
    new GenericArrayData(counts)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val dim = ctx.freshName("dim")
      val counts = ctx.freshName("counts")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val v = ctx.freshName("v")
      s"""
         |final int $dim = (int) $b;
         |final double[] $counts = new double[$dim];
         |final int $n = $a.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i)) {
         |    final long $v = $a.getLong($i);
         |    if ($v >= 0L && $v < $dim) $counts[(int) $v] += 1.0;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($counts);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): BucketCounts =
    copy(left = l, right = r)
}
