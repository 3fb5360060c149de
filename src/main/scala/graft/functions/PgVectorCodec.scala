package graft.functions

import java.util.Locale

/** pgvector text-literal codec (reference F9, `backend/models.py:104-107`:
  * the probe vector is serialized as `[x,y,...]` with Python `format(x,
  * "g")` — 6 significant digits). In-engine vectors stay binary
  * (SURVEY.md §2.7 F9 calls the text round-trip unnecessary); this codec
  * exists for byte-compatible interchange with pgvector-based systems and
  * for replaying reference requests exactly.
  */
object PgVectorCodec {

  /** Python '%g': 6 significant digits, trailing zeros stripped,
    * scientific notation outside [1e-4, 1e6).
    */
  private[graft] def formatG(x: Double): String = {
    if (x == 0.0) return "0"
    if (x.isNaN) return "nan"
    if (x.isInfinite) return if (x > 0) "inf" else "-inf"
    val s = String.format(Locale.ROOT, "%.6g", Double.box(x))
    if (s.contains("e") || s.contains("E")) {
      val Array(mant, exp) = s.toLowerCase(Locale.ROOT).split("e")
      val m = stripTrailing(mant)
      val expNum = exp.toInt
      val expStr = f"${math.abs(expNum)}%02d" // python keeps >= 2 exponent digits
      s"${m}e${if (expNum < 0) "-" else "+"}$expStr"
    } else stripTrailing(s)
  }

  private def stripTrailing(s: String): String =
    if (s.contains('.')) s.reverse.dropWhile(_ == '0').dropWhile(_ == '.').reverse
    else s

  /** `[x,y,...]` literal from a float vector. */
  def toLiteral(v: Array[Float]): String =
    v.map(x => formatG(x.toDouble)).mkString("[", ",", "]")

  /** Parse a pgvector literal back to floats. */
  def fromLiteral(s: String): Array[Float] = {
    val body = s.trim.stripPrefix("[").stripSuffix("]").trim
    if (body.isEmpty) Array.empty
    else body.split(",").map(_.trim.toFloat)
  }
}
