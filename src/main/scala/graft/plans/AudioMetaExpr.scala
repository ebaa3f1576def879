package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Real audio header decoding from raw bytes — the WAV slice of the
  * multimodal decode path, parsed straight from the public RIFF/WAVE
  * container format (Microsoft/IBM WAVE spec, RIFF 1991):
  *
  *  - `RIFF` + 4-byte little-endian riff size + `WAVE`, then a chunk
  *    walk: each chunk is a 4-byte id + 4-byte LE size + payload (odd
  *    sizes pad to word alignment).
  *  - The `fmt ` chunk carries audio format (2B LE; 1 = PCM), channel
  *    count (2B), sample rate (4B), byte rate (4B), block align (2B)
  *    and bits per sample (2B).
  *  - The `data` chunk's SIZE field gives the payload length;
  *    `duration_ms = data_bytes * 1000 / byte_rate` (integer division).
  *    The data bytes themselves are not required — a header probe reads
  *    chunk headers only, the streaming-ingest reality at 100 TB.
  *
  * Non-RIFF, truncated, or fmt-less payloads yield `ok=false` — per-row
  * quarantine, never a task failure. Codegen emits one static call, so
  * the parse stays inside whole-stage codegen.
  */
case class AudioMetaExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = AudioMetaExpr.schema
  override def prettyName: String = "graft_audio_meta"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a binary argument, got ${child.dataType}"
      )

  override def nullSafeEval(input: Any): Any =
    AudioMetaExpr.parse(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.AudioMetaExpr.parse($c)")

  override protected def withNewChildInternal(newChild: Expression): AudioMetaExpr =
    copy(child = newChild)
}

object AudioMetaExpr {

  val schema: StructType = StructType(
    Seq(
      StructField("format", StringType),
      StructField("channels", IntegerType),
      StructField("sample_rate", IntegerType),
      StructField("bits_per_sample", IntegerType),
      StructField("data_bytes", LongType),
      StructField("duration_ms", LongType),
      StructField("ok", BooleanType)
    )
  )

  @inline private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  @inline private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  @inline private def le32(b: Array[Byte], i: Int): Long =
    u8(b, i).toLong | (u8(b, i + 1).toLong << 8) | (u8(b, i + 2).toLong << 16) |
      (u8(b, i + 3).toLong << 24)
  @inline private def tag(b: Array[Byte], i: Int, s: String): Boolean =
    s.indices.forall(j => b(i + j) == s.charAt(j).toByte)

  private def fail: InternalRow =
    new GenericInternalRow(
      Array[Any](UTF8String.fromString("unknown"), null, null, null, null, null, false)
    )

  def parse(b: Array[Byte]): InternalRow = {
    if (b.length < 12 || !tag(b, 0, "RIFF") || !tag(b, 8, "WAVE")) return fail
    var i = 12
    var channels = -1
    var sampleRate = -1
    var bits = -1
    var byteRate = -1L
    var dataBytes = -1L
    // Walk chunk headers; a chunk whose payload runs past the buffer is
    // fine for `data` (header probes don't load payloads) but `fmt `
    // needs its 16 payload bytes present.
    while (i + 8 <= b.length && (channels < 0 || dataBytes < 0)) {
      val size = le32(b, i + 4)
      if (tag(b, i, "fmt ")) {
        if (i + 8 + 16 > b.length || size < 16) return fail
        val audioFormat = le16(b, i + 8)
        // PCM (1) and IEEE float (3) carry the fixed 16-byte prefix we
        // read; anything else is an extension we don't interpret.
        if (audioFormat != 1 && audioFormat != 3) return fail
        channels = le16(b, i + 10)
        sampleRate = le32(b, i + 12).toInt
        byteRate = le32(b, i + 16)
        bits = le16(b, i + 22)
        if (channels <= 0 || sampleRate <= 0 || byteRate <= 0 || bits <= 0) return fail
      } else if (tag(b, i, "data")) {
        dataBytes = size
      }
      // word alignment: odd chunk sizes pad one byte
      i += 8 + size.toInt + (size.toInt & 1)
    }
    if (channels < 0 || dataBytes < 0) return fail
    val durationMs = dataBytes * 1000L / byteRate
    new GenericInternalRow(
      Array[Any](
        UTF8String.fromString("wav"),
        channels,
        sampleRate,
        bits,
        dataBytes,
        durationMs,
        true
      )
    )
  }
}
