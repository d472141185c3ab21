package graft.functions

import java.nio.charset.StandardCharsets
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Banded random-hyperplane signature over a numeric vector, as ONE
  * tight loop per row — the bucketing kernel of LSH-based embedding
  * dedup and ANN.
  *
  * The sign family is the cross-engine-checkable one already used by
  * the ANN bucketer ([[graft.operators.SimilarityOps]] planeSigns):
  * component j of plane i is +1 iff the top bit of md5("p_<i>_<j>") is
  * set — so any engine with an md5() recomputes identical planes, and
  * the whole banding is DuckDB-oracle-able. Plane count is
  * nBands × bandBits; band b's key packs the sign bits of planes
  * b·bandBits .. b·bandBits+bandBits-1 (little-endian within the band).
  *
  * The composable alternative (one `aggregate(zip_with(...))` column
  * per plane) evaluates interpreted lambdas per element per plane —
  * 64 planes × 64 dims of interpreter overhead per row. This
  * expression does all nBands·bandBits dot products in native loops,
  * accumulating each in index order (bit-identical to the oracle's
  * per-plane sum). Two vectors agree on a band with probability
  * (1 − θ/π)^bandBits, so near-dup pairs (θ→0) collide in some band
  * with probability ≈ 1 − (1 − (1−θ/π)^bandBits)^nBands while far
  * pairs rarely do — each band key is a shuffle key, which is what
  * turns the n² pair search into an equi-join at 100 TB.
  *
  * Accepts array<float> or array<double>; accumulates in double.
  */
case class HyperplaneSig(child: Expression, nBands: Int, bandBits: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hyperplane_sig"

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }

  // sign matrix derived once per (observed) dimensionality; embedding
  // columns are fixed-width in practice so this computes exactly once
  @transient private lazy val signCache =
    new java.util.concurrent.ConcurrentHashMap[Integer, Array[Array[Int]]]()

  private def signs(dim: Int): Array[Array[Int]] =
    signCache.computeIfAbsent(dim, _ => Md5Bits.planeSigns(nBands * bandBits, dim))

  override def nullSafeEval(input: Any): Any =
    kernel(input.asInstanceOf[ArrayData])

  /** One banding loop shared by interpreted eval and the generated
    * code (codegen reference object) — bit-parity by construction,
    * whole-stage codegen preserved (the dimension-keyed sign-matrix
    * cache is real state, so the kernel stays a method rather than
    * inlined Java). */
  def kernel(input: ArrayData): ArrayData = {
    val v = input
    val dim = v.numElements()
    val sg = signs(dim)
    val f = isFloat
    val vals = new Array[Double](dim)
    var j = 0
    while (j < dim) {
      // parquet arrays default to containsNull=true: fail fast with a
      // descriptive error on a null element rather than an opaque NPE /
      // undefined sign — a null embedding component has no defensible
      // dot-product semantics and would silently diverge from the
      // DuckDB oracle's NULL-propagating sum
      if (v.isNullAt(j))
        throw new IllegalArgumentException(
          s"hyperplane_sig: null element at index $j of embedding array " +
            s"(dim=$dim); embeddings must be dense non-null vectors")
      vals(j) = if (f) v.getFloat(j).toDouble else v.getDouble(j)
      j += 1
    }
    val chunks = new Array[Any](nBands)
    var b = 0
    while (b < nBands) {
      var key = 0L
      var k = 0
      while (k < bandBits) {
        val row = sg(b * bandBits + k)
        var dot = 0d
        var i = 0
        while (i < dim) { dot += vals(i) * row(i); i += 1 }
        if (dot > 0) key |= (1L << k)
        k += 1
      }
      chunks(b) = key
      b += 1
    }
    new GenericArrayData(chunks)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val ref = ctx.addReferenceObj("hyperplaneSig", this, classOf[HyperplaneSig].getName)
      s"${ev.value} = $ref.kernel($arr);"
    })

  override protected def withNewChildInternal(c: Expression): HyperplaneSig =
    copy(child = c)
}
