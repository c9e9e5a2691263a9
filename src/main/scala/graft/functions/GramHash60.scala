package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `gram_hash60(array<string>, n) → array<long>` — every token n-gram of
  * the input, space-joined, md5-hashed, and compacted to the
  * [[graft.core.Portable.hash60]] 60-bit long, in ONE native pass.
  *
  * Why it exists: the portable formulation the dedup/text family uses —
  * `transform(sequence(0, size(ws) - n), i -> conv(substring(md5(
  * concat_ws(' ', slice(ws, i + 1, n))), 1, 15), 16, 10))` — is a
  * higher-order function, and HOF lambdas are interpreted per ELEMENT
  * with no codegen and no common-subexpression reuse: every gram
  * allocates a sliced array, a joined string, a 32-char hex string, and
  * a base-conversion pass (the q111/q181 lesson, one level deeper).
  * This expression computes each token's UTF-8 bytes ONCE per row, then
  * streams `word ' ' word …` bytes straight into a thread-local MD5 and
  * takes the top 60 bits of the digest — no gram string, no hex string,
  * no conv.
  *
  * BIT-COMPATIBLE with the portable formulation and the DuckDB oracle
  * (`('0x' || substr(md5(array_to_string(list_slice(ws, i+1, i+n), ' ')),
  * 1, 15))::BIGINT`): md5 is over the UTF-8 bytes of the space-joined
  * gram, and the first 15 hex chars ARE the first 60 bits of the digest
  * (big-endian first 8 bytes >>> 4). A NULL element is SKIPPED together
  * with its separator, exactly as `concat_ws` does (`concat_ws(' ',
  * 'a', NULL, 'b')` = `'a b'`, one space — an empty STRING, by
  * contrast, keeps its separators); the spec pins this corner. Fewer
  * than n tokens yields an EMPTY array (call sites guard with
  * size(ws) >= n anyway; the portable form's descending-sequence trap
  * does not exist here).
  *
  * Scale notes (100 TB): gram fingerprinting is the map-side kernel of
  * containment dedup (q178), winnowing (q181), novelty (q193), and the
  * shingle family — it parallelizes with executors and shuffles
  * nothing, so cutting its constant factor moves the whole family's
  * wall clock (measured A/Bs in SCALING.md).
  */
case class GramHash60(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 1, s"gram_hash60 needs n >= 1, got $n")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"gram_hash60 expects array<string>, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val ws = input.asInstanceOf[ArrayData]
    new GenericArrayData(GramHash60.hashAll(ws, n))
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    // the loop body is the static helper — codegen emits one call, so
    // the surrounding operators stay inside WholeStageCodegen (no
    // CodegenFallback span break) while the kernel runs as plain JVM
    // code the JIT compiles once
    nullSafeCodeGen(ctx, ev, a => {
      s"""
        ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
          graft.functions.GramHash60.hashAll($a, $n));
      """
    })

  override protected def withNewChildInternal(newChild: Expression): GramHash60 =
    copy(child = newChild)

  override def prettyName: String = "gram_hash60"
}

object GramHash60 {

  private val digests = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private val SPACE = Array[Byte](' ')
  private val EMPTY = Array.empty[Long]

  /** All n-gram hash60s of `ws`, in order. Called from both eval and the
    * generated code. */
  def hashAll(ws: ArrayData, n: Int): Array[Long] = {
    val len = ws.numElements()
    if (len < n) return EMPTY
    // each word's UTF-8 bytes exactly once per row; a null word stays
    // null here and is skipped WITH its separator below (concat_ws
    // semantics — an empty string, by contrast, keeps separators)
    val bytes = new Array[Array[Byte]](len)
    var i = 0
    while (i < len) {
      bytes(i) = if (ws.isNullAt(i)) null else ws.getUTF8String(i).getBytes
      i += 1
    }
    val md = digests.get()
    val out = new Array[Long](len - n + 1)
    var g = 0
    while (g <= len - n) {
      md.reset()
      var j = 0
      var first = true
      while (j < n) {
        val b = bytes(g + j)
        if (b != null) {
          if (!first) md.update(SPACE)
          md.update(b)
          first = false
        }
        j += 1
      }
      val d = md.digest()
      // first 15 hex chars of the digest = top 60 bits, big-endian
      var v = 0L
      var b = 0
      while (b < 8) { v = (v << 8) | (d(b) & 0xffL); b += 1 }
      out(g) = v >>> 4
      g += 1
    }
    out
  }
}
