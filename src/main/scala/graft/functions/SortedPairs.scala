package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StructField, StructType}

/** All ordered pairs (a, b) with a before b from a SORTED long array,
  * as one native pass: `sorted_pairs(ids)` ≡
  *
  *   flatten(transform(ids, (a, i) ->
  *     transform(slice(ids, i + 2, size(ids)), b -> struct(a AS da, b AS db))))
  *
  * but without the interpreted higher-order lambdas — Spark evaluates
  * HOFs per element through closure objects and never whole-stage-
  * codegens them, which made the nested-transform formulation the
  * single hottest kernel of the dedup pair generators (~1.5 s of task
  * time per consumer at sf0.1 for ~1M pairs). The input arrays are
  * CAP-BOUNDED by the families' anti-join discipline (≤ NgramDfCap /
  * LshBandCap elements), so the output is ≤ cap·(cap−1)/2 structs —
  * bounded per row at any corpus scale. The [[WordShingles]] pattern:
  * one kernel method shared verbatim by the interpreted eval and the
  * generated code, so both paths are bit-identical by construction. */
case class SortedPairs(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("da", LongType, nullable = false),
      StructField("db", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "sorted_pairs"

  override def nullSafeEval(input: Any): Any =
    kernel(input.asInstanceOf[ArrayData])

  def kernel(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    if (n < 2) return new GenericArrayData(Array.empty[Any])
    val ids = arr.toLongArray()
    val out = new Array[Any](n * (n - 1) / 2)
    var k = 0
    var i = 0
    while (i < n - 1) {
      var j = i + 1
      while (j < n) {
        out(k) = InternalRow(ids(i), ids(j))
        k += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val ref = ctx.addReferenceObj("sortedPairs", this, classOf[SortedPairs].getName)
      s"${ev.value} = $ref.kernel($arr);"
    })

  override protected def withNewChildInternal(c: Expression): SortedPairs = copy(child = c)
}
