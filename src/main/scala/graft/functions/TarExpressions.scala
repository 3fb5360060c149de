package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** TAR (POSIX ustar) container walk — the LAST archive family a crawl
  * or dataset mirror ships that this engine's container matrix lacked
  * (ZIP = m16, per-member GZIP = the .warc.gz layout; `.tar.gz` is the
  * distribution format of most public corpora and composes here as
  * `tar_entries(gunzip(blob))`). Format from the public POSIX.1-1988 /
  * pax spec: 512-byte header blocks (name, octal size, checksum,
  * typeflag, ustar magic, prefix), data rounded up to 512-byte blocks,
  * terminated by two zero blocks.
  *
  * Strict scope (refuse-loudly, whole-blob NULL — the m5-m8 posture):
  * the header CHECKSUM must verify (unsigned byte sum with the checksum
  * field read as spaces), magic must be `ustar` (POSIX `ustar\0` or the
  * GNU old-format `ustar  `), octal fields must parse, every entry's
  * data must fit, the two-zero-block terminator must be present, and
  * anything after it must be zero padding (tar pads to its blocking
  * factor). No GNU longname/longlink ('L'/'K') or pax extended headers
  * ('x'/'g') — those entries refuse loudly rather than silently
  * mis-listing a 100-char-truncated name.
  *
  * Listing walks headers only — a 10 GB member is skipped by
  * arithmetic, never read. Extraction is a bounds-checked copy (tar has
  * no per-member CRC; the .tar.gz composition gets integrity from the
  * gzip member's CRC-32 via [[Gunzip]]).
  */
case class TarEntries(child: Expression)
    extends UnaryExpression {
  override def prettyName: String = "tar_entries"
  override def dataType: DataType = TarEntries.Schema
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects binary, got ${other.simpleString}")
  }

  override def nullSafeEval(v: Any): Any =
    TarEntries.list(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.TarEntries.list($c);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Extract ONE named regular file's bytes (typeflag '0'/NUL) by
  * bounds-checked copy. NULL on missing name, non-file type, or any
  * structural malformation of the archive.
  */
case class TarExtract(left: Expression, right: Expression)
    extends BinaryExpression {
  override def prettyName: String = "tar_extract"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (a, b) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (binary, string), got (${a.simpleString}, ${b.simpleString})")
    }

  override def nullSafeEval(b: Any, n: Any): Any =
    TarEntries.extract(b.asInstanceOf[Array[Byte]], n.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, n) => s"""
      ${ev.value} = graft.functions.TarEntries.extract($b, $n.toString());
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object TarEntries {
  val Schema: DataType = ArrayType(StructType(Seq(
    StructField("name", StringType),
    StructField("typeflag", StringType),
    StructField("size", LongType),
    StructField("offset", LongType))), containsNull = false)

  private final case class Entry(name: String, typeflag: Char, size: Long, offset: Long)

  /** Octal field parse: leading spaces, >=1 octal digit, then only
    * NUL/space fill to the end. -1 on anything else (strict).
    */
  private def octal(b: Array[Byte], off: Int, len: Int): Long = {
    var i = off
    val end = off + len
    while (i < end && b(i) == ' '.toByte) i += 1
    if (i >= end) return -1
    var v = 0L
    var digits = 0
    while (i < end && b(i) >= '0'.toByte && b(i) <= '7'.toByte) {
      v = v * 8 + (b(i) - '0'.toByte); digits += 1; i += 1
      if (v > (1L << 40)) return -1 // 1 TiB member in one blob: refuse
    }
    if (digits == 0) return -1
    while (i < end) {
      if (b(i) != 0.toByte && b(i) != ' '.toByte) return -1
      i += 1
    }
    v
  }

  private def nulString(b: Array[Byte], off: Int, len: Int): String = {
    var end = off
    val cap = off + len
    while (end < cap && b(end) != 0.toByte) end += 1
    new String(b, off, end - off, java.nio.charset.StandardCharsets.UTF_8)
  }

  private def zeroBlock(b: Array[Byte], off: Int): Boolean = {
    var i = off
    while (i < off + 512) { if (b(i) != 0.toByte) return false; i += 1 }
    true
  }

  private def parse(b: Array[Byte]): Seq[Entry] = {
    if (b == null || b.length < 1024 || b.length % 512 != 0) return null
    val out = scala.collection.mutable.ArrayBuffer.empty[Entry]
    var pos = 0
    while (pos + 512 <= b.length) {
      if (zeroBlock(b, pos)) {
        // terminator: a second zero block, then only zero padding
        if (pos + 1024 > b.length) return null
        var i = pos + 512
        while (i < b.length) { if (b(i) != 0.toByte) return null; i += 1 }
        return out.toSeq
      }
      // magic at 257: "ustar" + (NUL | ' ')
      if (b(pos + 257) != 'u'.toByte || b(pos + 258) != 's'.toByte ||
          b(pos + 259) != 't'.toByte || b(pos + 260) != 'a'.toByte ||
          b(pos + 261) != 'r'.toByte ||
          (b(pos + 262) != 0.toByte && b(pos + 262) != ' '.toByte)) return null
      // checksum: unsigned sum with bytes 148-155 read as spaces
      val stored = octal(b, pos + 148, 8)
      if (stored < 0) return null
      var sum = 0L
      var i = 0
      while (i < 512) {
        sum += (if (i >= 148 && i < 156) 0x20 else b(pos + i) & 0xFF)
        i += 1
      }
      if (sum != stored) return null
      val size = octal(b, pos + 124, 12)
      if (size < 0) return null
      val tf0 = b(pos + 156).toChar
      val tf = if (tf0 == '\u0000') '0' else tf0 // old-format NUL = regular file
      if (tf == 'L' || tf == 'K' || tf == 'x' || tf == 'g') return null // out of scope: refuse
      val base = nulString(b, pos, 100)
      if (base.isEmpty) return null
      // POSIX prefix only under the NUL-terminated magic (GNU reuses the area)
      val prefix = if (b(pos + 262) == 0.toByte) nulString(b, pos + 345, 155) else ""
      val name = if (prefix.isEmpty) base else prefix + "/" + base
      val dataOffset = pos + 512L
      val dataBlocks = (size + 511) / 512
      val next = dataOffset + 512L * dataBlocks
      if (next > b.length) return null // torn: data does not fit
      out += Entry(name, tf, size, dataOffset)
      pos = next.toInt
    }
    null // fell off the end without the two-zero-block terminator
  }

  def list(b: Array[Byte]): GenericArrayData = {
    val es = parse(b)
    if (es == null) return null
    new GenericArrayData(es.map { e =>
      new GenericInternalRow(Array[Any](
        UTF8String.fromString(e.name), UTF8String.fromString(e.typeflag.toString),
        e.size, e.offset)): Any
    }.toArray)
  }

  def extract(b: Array[Byte], name: String): Array[Byte] = {
    val es = parse(b)
    if (es == null) return null
    es.find(e => e.name == name && e.typeflag == '0') match {
      case Some(e) =>
        val out = new Array[Byte](e.size.toInt)
        System.arraycopy(b, e.offset.toInt, out, 0, e.size.toInt)
        out
      case None => null
    }
  }
}
