package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Catalyst-native winnowing anchors: text → the 1-based positions of
  * the robust-winnowing anchor grams (window `w` over the per-position
  * 48-bit md5 gram hashes, rightmost-min selection, first-occurrence
  * dedup) in ONE imperative pass.
  *
  * Semantically identical to the composed-builtin form
  * ([[graft.operators.CurationQueries.anchorsOfComposed]]: md5 per
  * `transform` element + `WinnowingQueries.winnowPositionsW`'s
  * slice/reverse/array_min per window — asserted equal by spec), but
  * those higher-order functions evaluate INTERPRETED, one Catalyst tree
  * walk per gram position and per window element: the strided-span scan
  * of an sf0.1 corpus is ~1.3M positions × (1 digest + ~8 small-array
  * ops) of interpreter overhead, which made `docs_duplicate_spans_
  * strided` the most expensive registry query. Here it is one compiled
  * loop per DOCUMENT — a digest per position and a ring-buffer
  * rightmost-min per window, nothing else. The composed form remains as
  * the cross-engine specification (the DuckDB oracle replays it
  * unchanged, so the hash gate certifies the native kernel too).
  */
case class WinnowAnchorsExpr(child: Expression, g: Int, w: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_winnow_anchors"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string argument, got ${child.dataType}"
      )

  override def nullSafeEval(input: Any): Any =
    WinnowAnchorsExpr.compute(input.asInstanceOf[UTF8String], g, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.WinnowAnchorsExpr.compute($c, $g, $w)")

  override protected def withNewChildInternal(newChild: Expression): WinnowAnchorsExpr =
    copy(child = newChild)
}

object WinnowAnchorsExpr {

  private val md5 = ThreadLocal.withInitial(
    new java.util.function.Supplier[java.security.MessageDigest] {
      def get(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }
  )

  def compute(text: UTF8String, g: Int, w: Int): ArrayData = {
    val n = text.numChars()
    val m = n - (g - 1)
    if (m <= 0) return new GenericArrayData(Array.emptyIntArray)
    // hs[p] (0-based p here, 1-based in the composed form): the first 12
    // md5 hex chars of the character-based gram substring — exactly
    // conv(substring(md5(substr(text, p, G)), 1, 12), 16, 10).
    val md = md5.get()
    val hs = new Array[Long](m)
    var p = 0
    while (p < m) {
      val bytes = text.substringSQL(p + 1, g).getBytes
      val d = md.digest(bytes)
      var h = 0L
      var i = 0
      while (i < 6) {
        h = (h << 8) | (d(i) & 0xffL)
        i += 1
      }
      hs(p) = h
      p += 1
    }
    val out = new java.util.LinkedHashSet[Integer]()
    if (m >= w) {
      // Rightmost argmin per window, O(m·w) with w small — the same
      // selection slice/reverse/array_position computes per window.
      var i = 0
      while (i <= m - w) {
        var best = i
        var j = i + 1
        while (j < i + w) {
          if (hs(j) <= hs(best)) best = j
          j += 1
        }
        out.add(best + 1)
        i += 1
      }
    } else {
      var best = 0
      var j = 1
      while (j < m) {
        if (hs(j) <= hs(best)) best = j
        j += 1
      }
      out.add(best + 1)
    }
    val arr = new Array[Int](out.size)
    val it = out.iterator()
    var k = 0
    while (it.hasNext) { arr(k) = it.next(); k += 1 }
    new GenericArrayData(arr)
  }
}
