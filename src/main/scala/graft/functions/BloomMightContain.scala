package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, NullType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** `bloom_might_contain(key, sketchBytes)` — per-row membership test
  * against a serialized [[org.apache.spark.util.sketch.BloomFilter]]
  * (the PUBLIC Spark sketch API; `df.stat.bloomFilter` builds one
  * distributed). The sketch argument must be FOLDABLE (a binary
  * literal): it deserializes ONCE per operator instance and the
  * generated code hits the in-memory bit array per row — the executor
  * side of the "bloom pre-pass before the exact anti-join" shape
  * every at-scale incremental-dedup pipeline runs
  * ([[graft.operators.DedupOps.dedupIncrementalBloom]]).
  *
  * Correctness note: a Bloom filter answers "definitely absent" or
  * "maybe present" — callers must route the maybe-present rows
  * through an exact check. False positives therefore never reach an
  * output; that is what keeps the composed operator hash-checkable
  * against an oracle that knows nothing about the sketch.
  *
  * String keys are tested through their UTF-8 bytes
  * (`mightContainBinary`), which is exactly what `putString` inserted
  * on the build side — one hash contract on both ends. */
case class BloomMightContain(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  require(right.foldable, "bloom_might_contain: sketch must be a literal")

  // The function is SQL-registered (user-reachable): reject bad key /
  // sketch types at ANALYSIS time rather than surfacing as a runtime
  // ClassCastException in nullSafeEval or the lazy `bloom` val.
  override def checkInputDataTypes(): TypeCheckResult = left.dataType match {
    // NullType: a bare NULL literal key analyzed (and returned NULL)
    // before this check existed — keep that contract
    case StringType | BinaryType | NullType if right.dataType == BinaryType =>
      TypeCheckResult.TypeCheckSuccess
    case StringType | BinaryType | NullType =>
      TypeCheckResult.TypeCheckFailure(
        s"bloom_might_contain: sketch must be BINARY, got ${right.dataType.sql}")
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"bloom_might_contain: key must be STRING or BINARY, got ${other.sql}")
  }

  @transient private lazy val bloom: BloomFilter = {
    val bytes = right.eval().asInstanceOf[Array[Byte]]
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(bytes))
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val res = left.dataType match {
      case BinaryType => bloom.mightContainBinary(l.asInstanceOf[Array[Byte]])
      case _          => bloom.mightContainBinary(
        l.asInstanceOf[UTF8String].getBytes)
    }
    java.lang.Boolean.valueOf(res)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (k, _) => {
      // the deserialized sketch rides along as a codegen reference
      // object — shared across all rows of the operator instance
      val ref = ctx.addReferenceObj("bloom", bloom, classOf[BloomFilter].getName)
      val bytes =
        if (left.dataType == BinaryType) k else s"$k.getBytes()"
      s"${ev.value} = $ref.mightContainBinary($bytes);"
    })

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): BloomMightContain = copy(left = l, right = r)
}
