package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Catalyst-native MinHash signature: text → array of `k` 48-bit minima
  * over word `shingleN`-gram shingles, in ONE imperative pass.
  *
  * Semantically identical to the composed-builtin form
  * `TextFunctions.minhashSignature` (normalize → split → shingle →
  * md5-per-shingle → two-hash family minima; asserted equal by spec), but
  * without materializing the intermediate word/shingle/struct arrays or
  * the k-way `transform`/`array_min` expression tree — per document this
  * is one digest per shingle and k running minima, nothing else. On a
  * 100 TB corpus the signature pass is the dominant minhash cost, so the
  * native kernel is the scale path; the composed form remains as the
  * cross-engine (DuckDB oracle) specification.
  */
case class MinHashSigExpr(child: Expression, k: Int, shingleN: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash_sig"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string argument, got ${child.dataType}"
      )

  override def nullSafeEval(input: Any): Any =
    MinHashSigExpr.compute(input.asInstanceOf[UTF8String], k, shingleN)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(
      ctx,
      ev,
      c => s"graft.plans.MinHashSigExpr.compute($c, $k, $shingleN)"
    )

  override protected def withNewChildInternal(newChild: Expression): MinHashSigExpr =
    copy(child = newChild)
}

object MinHashSigExpr {

  /** Same modulus as TextFunctions.MinhashMod: 2^48 - 1. */
  val Mod = 281474976710655L

  // One digest per executor thread, not per row: shingle hashing is the
  // dominant cost path and a per-row getInstance is measurable GC churn.
  private val md5 = ThreadLocal.withInitial(
    new java.util.function.Supplier[java.security.MessageDigest] {
      def get(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }
  )

  def compute(text: UTF8String, k: Int, shingleN: Int): ArrayData = {
    // Mirror the composed pipeline exactly: regexp \s+ → ' ', trim of
    // spaces (all ends are spaces after the collapse), Lower's lowercase.
    val collapsed = text.toString.replaceAll("\\s+", " ")
    val norm = UTF8String.fromString(collapsed).trim.toLowerCase.toString
    // split(norm, " ") keeps trailing empties (Spark's split uses limit -1)
    val ws = norm.split(" ", -1)
    val mins = Array.fill(k)(Long.MaxValue)
    val md = md5.get()
    def fold(shingle: String): Unit = {
      // digest() resets the MessageDigest itself — no explicit reset needed.
      val d = md.digest(shingle.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      // hex chars 1-12 / 13-24 of the digest = bytes 0-5 / 6-11 big-endian
      var h1 = 0L
      var h2 = 0L
      var i = 0
      while (i < 6) {
        h1 = (h1 << 8) | (d(i) & 0xffL)
        h2 = (h2 << 8) | (d(i + 6) & 0xffL)
        i += 1
      }
      var j = 0
      while (j < k) {
        // h1 + j*h2 < (k+1) * 2^48 — no long overflow for any sane k
        val v = (h1 + j * h2) % Mod
        if (v < mins(j)) mins(j) = v
        j += 1
      }
    }
    if (ws.length >= shingleN) {
      val sb = new java.lang.StringBuilder
      var i = 0
      while (i <= ws.length - shingleN) {
        sb.setLength(0)
        var g = 0
        while (g < shingleN) {
          if (g > 0) sb.append(' ')
          sb.append(ws(i + g))
          g += 1
        }
        fold(sb.toString)
        i += 1
      }
    } else {
      fold(norm)
    }
    new GenericArrayData(mins)
  }
}
