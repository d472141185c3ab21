package graft.functions

import java.security.MessageDigest
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass MinHash signature over a shingle array → array of K
  * 32-char lowercase-hex strings, where
  *
  *   sig_i = min over shingles g of md5hex(g ++ "_" ++ i)
  *
  * — the exact contract of the SQL formulation
  * `array_min(transform(gs, g -> md5(concat(g, '_<i>'))))` and of its
  * DuckDB replica, so swapping this in changes NOTHING the oracle can
  * see (round-3 verdict #5). What changes is the cost: the
  * pre-round-4 pipeline ran K=16 separate interpreted `transform`
  * passes, allocating a 32-char hex string per (shingle, i); this
  * expression makes ONE pass over the array and tracks the K minima on
  * the raw 16-byte digests — valid because lowercase-hex rendering is
  * order-preserving w.r.t. unsigned byte order, so unsigned digest
  * comparison IS the hex-string comparison. Only the K winning digests
  * are ever hex-encoded.
  *
  * The MD5 state after the shared `g ++ "_"` prefix is computed once
  * per shingle and clone()d per i (JDK MD5 is Cloneable), so each of
  * the K variant hashes digests only the 1–2 suffix digit bytes.
  *
  * Null/empty semantics mirror the transform formulation: null array →
  * null (UnaryExpression), empty array or all-null elements → null
  * (array_min of an empty/all-null array), null elements skipped.
  */
case class MinHashMd5(child: Expression, k: Int = 16)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "minhash_md5"
  override def nullable: Boolean = true

  // "_0".."_{k-1}" suffix bytes, built once per expression instance
  @transient private lazy val suffixes: Array[Array[Byte]] =
    Array.tabulate(k)(i => ("_" + i).getBytes(java.nio.charset.StandardCharsets.US_ASCII))

  private def unsignedLess(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < a.length) {
      val x = a(i) & 0xFF
      val y = b(i) & 0xFF
      if (x != y) return x < y
      i += 1
    }
    false
  }

  private val hexDigits = "0123456789abcdef".toCharArray

  private def hex(d: Array[Byte]): String = {
    val cs = new Array[Char](d.length * 2)
    var i = 0
    while (i < d.length) {
      val b = d(i) & 0xFF
      cs(2 * i) = hexDigits(b >> 4)
      cs(2 * i + 1) = hexDigits(b & 0xF)
      i += 1
    }
    new String(cs)
  }

  override def nullSafeEval(input: Any): Any =
    kernel(input.asInstanceOf[ArrayData])

  /** One signature loop shared by interpreted eval and the generated
    * code (codegen reference object) — bit-parity by construction,
    * whole-stage codegen preserved. Returns null for empty / all-null
    * shingle arrays (array_min semantics); the generated code routes
    * that through `ev.isNull`. */
  def kernel(input: ArrayData): ArrayData = {
    val arr = input
    val n = arr.numElements()
    val mins = new Array[Array[Byte]](k)
    val base = MessageDigest.getInstance("MD5")
    var e = 0
    while (e < n) {
      if (!arr.isNullAt(e)) {
        val gBytes = arr.getUTF8String(e).getBytes
        base.reset()
        base.update(gBytes)
        var i = 0
        while (i < k) {
          val m =
            try base.clone().asInstanceOf[MessageDigest]
            catch {
              case _: CloneNotSupportedException =>
                val f = MessageDigest.getInstance("MD5")
                f.update(gBytes)
                f
            }
          m.update(suffixes(i))
          val d = m.digest()
          if (mins(i) == null || unsignedLess(d, mins(i))) mins(i) = d
          i += 1
        }
      }
      e += 1
    }
    if (mins(0) == null) return null
    val out = new Array[Any](k)
    var i = 0
    while (i < k) { out(i) = UTF8String.fromString(hex(mins(i))); i += 1 }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val ref = ctx.addReferenceObj("minHashMd5", this, classOf[MinHashMd5].getName)
      val res = ctx.freshName("mhRes")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $res = $ref.kernel($arr);
         |if ($res == null) { ${ev.isNull} = true; } else { ${ev.value} = $res; }
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): MinHashMd5 = copy(child = c)
}
