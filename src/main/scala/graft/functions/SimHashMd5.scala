package graft.functions

import java.nio.ByteBuffer
import java.security.MessageDigest
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Shared bit-derivation for the CROSS-ENGINE-CHECKABLE SimHash family.
  *
  * The token hash is MD5 and bit j of a token (j ∈ 0..63) is defined on
  * the lowercase-hex rendering of the digest exactly as an ANSI engine
  * would compute it:
  *
  *   nibble = hexval( md5hex(token)[ j/4 ] )     (0-based char index)
  *   bit_j  = (nibble >> (j % 4)) & 1
  *
  * i.e. in DuckDB: `((strpos('0123456789abcdef', substr(md5(t), j//4+1, 1))
  * - 1) >> (j % 4)) & 1`. That makes the whole signature reproducible in
  * any engine with an md5() — which is what converts the SimHash dedup
  * operators from rows-only checks into hash-matched oracle rows.
  *
  * The signature is returned as FOUR 16-bit band chunks (array<long>,
  * little-endian bit order within each chunk) rather than one assembled
  * int64: banding needs the chunks anyway, and a 64-bit value with bit
  * 63 set is not portably constructible in engines whose integer sums
  * widen (DuckDB list_sum → HUGEINT overflows the BIGINT cast).
  *
  * The xxhash64-based [[SimHash]]/[[SimHashAgg]] remain the throughput
  * path (XXH64 is ~5-10× faster per token than MD5); this family is the
  * verifiable path. Both share the Charikar construction (reference for
  * the dedup context: SURVEY §2 LLM-pipeline ops).
  */
object Md5Bits {
  private val md = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  def digest(bytes: Array[Byte]): Array[Byte] = {
    val m = md.get()
    m.reset()
    m.digest(bytes)
  }

  /** Add one token's ±1 bit contributions into the 64-counter buffer. */
  def accumulate(counts: Array[Int], tokenUtf8: Array[Byte]): Unit = {
    val d = digest(tokenUtf8)
    var j = 0
    while (j < 64) {
      val hexIdx = j >> 2
      val b = d(hexIdx >> 1) & 0xFF
      val nibble = if ((hexIdx & 1) == 0) (b >> 4) & 0xF else b & 0xF
      if (((nibble >> (j & 3)) & 1) == 1) counts(j) += 1 else counts(j) -= 1
      j += 1
    }
  }

  /** Deterministic ±1 hyperplane signs — THE cross-engine plane family
    * shared by the ANN bucketer and [[HyperplaneSig]]: component j of
    * plane i is +1 iff the top bit of md5("p_<i>_<j>") is set (first
    * hex char in '89abcdef'). One definition so the sign contract the
    * DuckDB oracles replicate cannot drift between operators. */
  def planeSigns(nPlanes: Int, dim: Int): Array[Array[Int]] =
    Array.tabulate(nPlanes, dim) { (i, j) =>
      val d = digest(s"p_${i}_$j".getBytes(java.nio.charset.StandardCharsets.UTF_8))
      if ((d(0) & 0x80) != 0) 1 else -1
    }

  /** Fold the counter buffer to the 4 × 16-bit signature chunks. */
  def toChunks(counts: Array[Int]): GenericArrayData = {
    val chunks = new Array[Any](4)
    var b = 0
    while (b < 4) {
      var c = 0L
      var k = 0
      while (k < 16) {
        if (counts(16 * b + k) > 0) c |= (1L << k)
        k += 1
      }
      chunks(b) = c
      b += 1
    }
    new GenericArrayData(chunks)
  }
}

/** Scalar md5-SimHash over a token array → array<long> of 4 band
  * chunks. Native Catalyst expression (one pass over the array, no
  * row explosion) — see [[Md5Bits]] for the bit contract. */
case class SimHashMd5(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "simhash_md5"

  override def nullSafeEval(input: Any): Any =
    kernel(input.asInstanceOf[ArrayData])

  /** One signature loop shared by interpreted eval and the generated
    * code (codegen reference object) — bit-parity by construction,
    * whole-stage codegen preserved (MD5 state is a real object, so the
    * kernel stays a method rather than inlined Java). */
  def kernel(arr: ArrayData): ArrayData = {
    val counts = new Array[Int](64)
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) {
        Md5Bits.accumulate(counts, arr.getUTF8String(i).getBytes)
      }
      i += 1
    }
    Md5Bits.toChunks(counts)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val ref = ctx.addReferenceObj("simHashMd5", this, classOf[SimHashMd5].getName)
      s"${ev.value} = $ref.kernel($arr);"
    })

  override protected def withNewChildInternal(c: Expression): SimHashMd5 = copy(child = c)
}

/** md5-SimHash as a true AGGREGATE (the md5 sibling of [[SimHashAgg]]):
  * folds token arrays from many rows into one signature per group via a
  * 64-counter partial buffer — the shuffle carries 256 bytes per group
  * regardless of token count. group-of-rows ≡ concat-of-tokens, pinned
  * in FunctionsSpec. */
case class SimHashMd5Agg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Int]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "simhash_md5_agg"

  override def createAggregationBuffer(): Array[Int] = new Array[Int](64)

  override def update(buf: Array[Int], input: InternalRow): Array[Int] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      var i = 0
      while (i < arr.numElements()) {
        if (!arr.isNullAt(i)) {
          Md5Bits.accumulate(buf, arr.getUTF8String(i).getBytes)
        }
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Int], b: Array[Int]): Array[Int] = {
    var i = 0
    while (i < 64) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Int]): Any = Md5Bits.toChunks(buf)

  override def serialize(buf: Array[Int]): Array[Byte] = {
    val bb = ByteBuffer.allocate(64 * 4)
    buf.foreach(bb.putInt)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Int] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(64)(bb.getInt())
  }

  override def withNewMutableAggBufferOffset(n: Int): SimHashMd5Agg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): SimHashMd5Agg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): SimHashMd5Agg =
    copy(child = cs.head)
}
