package graft.queries

/** Shared DuckDB-SQL builders for the sketch-kernel oracles (d3 MinHash,
  * d4 SimHash, v8 hyperplane LSH): the engine's exact FNV-1a / splitmix64
  * arithmetic restated as portable SQL over 64-bit unsigned values.
  *
  * Values live as UBIGINT in [0, 2^64); wraparound multiplication is
  * decomposed into 32-bit halves so every intermediate fits 64 bits, with
  * one HUGEINT add per step for the final carry. Deliberately NO `% 2^64`
  * on HUGEINT anywhere: 128-bit division is ~20x slower than masked adds
  * (measured 36 s -> 1.7 s for the d3 signature pipeline at sf0.01),
  * while `&`/`>>`/`xor` are single vector ops. Same precedent as t8's
  * rolling hash: restating kernel arithmetic in SQL the oracle engine can
  * vectorize.
  */
private[queries] object SketchSql {

  val Mask64 = "18446744073709551615"

  /** (x * c) mod 2^64 for UBIGINT expression `x` and constant c:
    * x*c = x_lo*c_lo + (x_hi*c_lo + x_lo*c_hi)*2^32 (+ overflow bits that
    * vanish mod 2^64); each partial product of 32-bit halves is < 2^64.
    */
  def mulModU(x: String, c: Long): String = {
    val ch = c >>> 32; val cl = c & 0xffffffffL
    val t1 = s"((($x) & 4294967295) * $cl)"
    val t2 = s"(((($x) >> 32) * $cl) & 4294967295) * 4294967296"
    val t3 = s"(((($x) & 4294967295) * $ch) & 4294967295) * 4294967296"
    s"CAST((CAST($t1 AS HUGEINT) + ($t2) + ($t3)) & $Mask64 AS UBIGINT)"
  }

  def addModU(a: String, b: String): String =
    s"CAST((CAST($a AS HUGEINT) + ($b)) & $Mask64 AS UBIGINT)"

  /** FNV-1a 64 (SketchHash.fnv1a64) over the UTF-8 BYTES of column `s`:
    * bytes come from hex(encode(s)) two hex digits at a time, so multi-byte
    * characters hash identically to the JVM's getBytes("UTF-8") — unlike a
    * code-point walk, which would diverge on any non-ASCII token.
    */
  val FnvSql: String =
    "list_reduce(list_prepend(CAST(14695981039346656037 AS UBIGINT), " +
      "list_transform([hex(encode(s))], hx -> list_transform(generate_series(1, len(hx)//2), " +
      "i -> CAST(strpos('0123456789ABCDEF', hx[2*i-1:2*i-1])-1 AS UBIGINT)*16 " +
      "+ (strpos('0123456789ABCDEF', hx[2*i:2*i])-1)))[1]), " +
      s"(h, b) -> ${mulModU("xor(h, b)", 0x100000001b3L)})"

  /** UBIGINT -> the signed BIGINT with the same bit pattern (MinHash slot
    * minima compare in the SIGNED domain, matching the JVM's Long order).
    */
  def signedSql(u: String): String =
    s"CAST(CASE WHEN ($u) >= 9223372036854775808 THEN CAST($u AS HUGEINT) - 18446744073709551616 ELSE CAST($u AS HUGEINT) END AS BIGINT)"

  /** Tokenization / word-3-gram shingling of the documents table, matching
    * the engine's shingle_set convention (trim + split on \s+).
    */
  val ToksSql = "string_split_regex(trim(text), '\\s+')"
  def shinglesSql(w: String): String =
    s"list_distinct(list_transform(generate_series(1, len($w) - 2), i -> array_to_string($w[i:i+2], ' ')))"

  /** Three layered CTE selects applying the splitmix64 finalizer to column
    * `z` of CTE `src`, emitting the mixed value as `u` in `<src>mu`.
    * Layered projections instead of nested lambdas so the oracle engine
    * vectorizes each stage; `keep` columns pass through unchanged.
    */
  def mixLayerCtes(src: String, keep: Seq[String]): String = {
    val k = keep.mkString(", ")
    s"""${src}m1 AS (SELECT $k, ${mulModU("xor(z, z >> 30)", 0xbf58476d1ce4e5b9L)} AS z FROM $src),
       |${src}m2 AS (SELECT $k, ${mulModU("xor(z, z >> 27)", 0x94d049bb133111ebL)} AS z FROM ${src}m1),
       |${src}mu AS (SELECT $k, xor(z, z >> 31) AS u FROM ${src}m2)""".stripMargin
  }

  /** The CmBuckets row-seed `(r + 1) * Golden` mod 2^64, for a column or
    * expression `r` holding the sketch-row index.
    */
  def cmSeedSql(r: String): String =
    mulModU(s"CAST(($r) + 1 AS UBIGINT)", 0x9e3779b97f4a7c15L)

  /** Count-Min register CTEs over `documents` (t44/t44b): lowercased
    * whitespace tokens -> per-token counts -> FNV-1a -> per-sketch-row
    * seeded splitmix64 -> bucket grid, emitted as `<p>regs(r, b, cnt)`
    * exactly matching [[graft.functions.CmBuckets]] + CountMin.registers.
    * The prefix keeps multi-instance oracles collision-free (mixLayerCtes
    * derives `<src>m1..mu` names); `where` optionally filters documents
    * so shard oracles reuse the builder. `<p>tc` is MATERIALIZED — the
    * t44 oracle reads it twice and DuckDB would otherwise re-expand the
    * token unnest per reference.
    */
  def cmRegisterCtes(p: String, depth: Int, width: Int,
                     where: String = "TRUE"): String =
    cmRegisterCtesFrom(p, depth, width,
      s"""SELECT t.term AS s
         |  FROM documents, unnest(string_split_regex(lower(text), '\\s+')) AS t(term)
         |  WHERE t.term <> '' AND ($where)""".stripMargin)

  /** General form: `toksSelect` is any SELECT producing the item column
    * `s`, one row per sketch increment (e23 feeds event types; the
    * documents overload above feeds tokens).
    */
  def cmRegisterCtesFrom(p: String, depth: Int, width: Int,
                         toksSelect: String): String =
    s"""${p}toks AS (
       |  $toksSelect),
       |${p}tc AS MATERIALIZED (SELECT s, COUNT(*) AS c FROM ${p}toks GROUP BY s),
       |${p}f AS (SELECT c, $FnvSql AS h FROM ${p}tc),
       |${p}rs AS (SELECT c, g.r AS r, xor(h, ${cmSeedSql("g.r")}) AS z
       |           FROM ${p}f CROSS JOIN generate_series(0, ${depth - 1}) AS g(r)),
       |${mixLayerCtes(s"${p}rs", Seq("c", "r"))},
       |${p}regs AS (
       |  SELECT CAST(r AS BIGINT) AS r,
       |    CAST((u >> 1) % $width AS BIGINT) AS b,
       |    CAST(SUM(c) AS BIGINT) AS cnt
       |  FROM ${p}rsmu GROUP BY 1, 2)""".stripMargin
}
