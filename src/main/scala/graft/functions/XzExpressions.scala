package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType}

/** XZ/LZMA2 inflation as a scan-fused expression — the third member of
  * the [[Gunzip]]/[[Zunstd]] mirror-encoding family: the long tail of
  * dataset and software mirrors (GNU, kernel.org, Debian-era dumps)
  * ships `.tar.xz`. The decoder is the org.tukaani `xz` library Spark
  * itself ships on its runtime classpath (`/opt/spark/jars/xz-*.jar`,
  * how Spark reads xz-compressed text sources), so this adds no
  * dependency.
  *
  * Same posture as its siblings: whole-blob NULL on any malformation
  * (bad magic `FD 37 7A 58 5A 00`, torn stream, CRC32/CRC64/SHA-256
  * check mismatch — the library verifies whichever check the stream
  * header declares), NULL past the 256 MB inflation cap and NULL when
  * the declared LZMA2 dictionary alone exceeds the same budget (a
  * decompression bomb in a scan task is an attack, not data).
  * Concatenated streams (with optional 4-byte-aligned stream padding,
  * xz(1) §"Concatenation") inflate to the concatenated payloads via
  * `XZInputStream`'s native multi-stream mode, matching the
  * multi-member gzip and multi-frame zstd contracts. Per-row, no
  * shuffle — at 100 TB this is one more fused stage between the binary
  * column and `tar_entries`. Unlike zstd there is no JNI context here
  * (pure Java), so the stream path carries no per-blob native-allocation
  * overhead class.
  */
case class Zunxz(child: Expression)
    extends UnaryExpression {
  override def prettyName: String = "zunxz"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects binary, got ${other.simpleString}")
  }

  override def nullSafeEval(v: Any): Any =
    Zunxz.inflate(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.Zunxz.inflate($c);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object Zunxz {
  /** Inflation cap per blob — the same bomb refusal as [[Gunzip]]. */
  val MaxBytes: Int = 256 * 1024 * 1024

  /** Decoder memory budget in KiB: refuses streams whose declared
    * dictionary alone would out-allocate the inflation cap (mirrors
    * write <= 64 MiB dictionaries; xz -9 is 64 MiB).
    */
  private val MemLimitKiB: Int = 256 * 1024

  private val Magic = Array[Int](0xFD, '7', 'z', 'X', 'Z', 0x00)

  private def hasMagic(b: Array[Byte]): Boolean = {
    if (b.length < Magic.length) return false
    var i = 0
    while (i < Magic.length) {
      if ((b(i) & 0xFF) != Magic(i)) return false
      i += 1
    }
    true
  }

  def inflate(b: Array[Byte]): Array[Byte] = {
    if (b == null || !hasMagic(b)) return null
    try {
      // multi-stream mode: decodes concatenated streams + stream
      // padding, and REFUSES trailing garbage (CorruptedInputException)
      // — the arbiter of validity, like Zunstd's stream path
      val in = new org.tukaani.xz.XZInputStream(
        new java.io.ByteArrayInputStream(b), MemLimitKiB)
      try {
        val out = new java.io.ByteArrayOutputStream(math.min(b.length * 4, 1 << 20))
        val buf = new Array[Byte](64 * 1024)
        var n = in.read(buf)
        while (n >= 0) {
          if (out.size().toLong + n > MaxBytes) return null // bomb refusal
          out.write(buf, 0, n)
          n = in.read(buf)
        }
        out.toByteArray
      } finally in.close()
    } catch {
      // torn stream (EOFException), check mismatch / garbage
      // (CorruptedInputException), declared-dictionary bomb
      // (MemoryLimitException), unsupported options — all IOExceptions
      case _: java.io.IOException => null
    }
  }
}
