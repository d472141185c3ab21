package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word-n-gram shingles (default 3) over a token array, as
  * one native pass — for n = 3 semantically identical to
  *
  *   CASE WHEN size(ws) >= 3
  *   THEN array_distinct(transform(sequence(0, size(ws) - 3),
  *          i -> concat_ws(' ', ws[i], ws[i+1], ws[i+2])))
  *   ELSE array() END
  *
  * (and to the DuckDB `list_distinct([ws[i] || ' ' || …])` replica),
  * but without the interpreted higher-order lambdas: profiling the LSH
  * pipeline at sf0.1 put ~4 s of its ~4.4 s wall in this shingle
  * formulation alone — interpreted `transform` allocates per-element
  * closures and concat_ws re-evaluates the array lookup per position.
  * Here: one loop, a LinkedHashSet for first-occurrence-order dedup
  * (the order array_distinct produces; all downstream uses — MinHash
  * minima, intersection sizes — are order-insensitive anyway).
  *
  * Null tokens render as empty strings, matching concat_ws semantics
  * (concat_ws skips nulls, so `a <null> b` → "a  b"? No — concat_ws
  * DROPS nulls entirely, yielding "a b"; this is reproduced exactly
  * below). The guard for < 3 tokens mirrors the CASE's empty array —
  * Spark's sequence(0, -1) would otherwise step DOWNWARD and fabricate
  * junk shingles.
  */
case class WordShingles(child: Expression, n: Int = 3)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override def nullSafeEval(input: Any): Any =
    kernel(input.asInstanceOf[ArrayData])

  /** The one shingle loop, shared verbatim by the interpreted eval and
    * the generated code (called through a codegen reference object) —
    * bit-parity between the two paths by construction, and the
    * expression no longer breaks whole-stage codegen the way the old
    * CodegenFallback did (the per-row dedup set needs real data
    * structures, so the kernel stays a method rather than inlined
    * Java). */
  def kernel(arr: ArrayData): ArrayData = {
    val nToks = arr.numElements()
    if (nToks < n) return new GenericArrayData(Array.empty[Any])
    // concat_ws(' ', a, b, c) drops NULL arguments (no separator left
    // behind), so pre-render each token and join only non-nulls
    val toks = new Array[String](nToks)
    var i = 0
    while (i < nToks) {
      toks(i) = if (arr.isNullAt(i)) null else arr.getUTF8String(i).toString
      i += 1
    }
    val seen = new java.util.LinkedHashSet[String]()
    i = 0
    while (i <= nToks - n) {
      val sb = new java.lang.StringBuilder()
      var first = true
      var j = i
      while (j < i + n) {
        if (toks(j) != null) {
          if (!first) sb.append(' ')
          sb.append(toks(j))
          first = false
        }
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    i = 0
    while (it.hasNext) { out(i) = UTF8String.fromString(it.next()); i += 1 }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val ref = ctx.addReferenceObj("wordShingles", this, classOf[WordShingles].getName)
      s"${ev.value} = $ref.kernel($arr);"
    })

  override protected def withNewChildInternal(c: Expression): WordShingles = copy(child = c)
}
