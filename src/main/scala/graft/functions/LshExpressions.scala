package graft.functions

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Expressions for embedding-space blocking: feature-hashed term-frequency
  * vectors (Weinberger et al. 2009, "Feature Hashing for Large Scale
  * Multitask Learning" — the construction behind Spark MLlib's HashingTF)
  * and sign-random-projection LSH (Charikar 2002, SimHash over Gaussian
  * hyperplanes), the standard candidate-blocking scheme for cosine
  * similarity.
  *
  * Both are deterministic: token hashing uses the self-contained FNV-1a /
  * splitmix64 stack from [[SketchHash]], and the Gaussian hyperplanes are
  * generated from a fixed seed via a counter-mode splitmix64 stream +
  * Box-Muller — stable across sessions, partitions, and replays.
  *
  * Scale notes (100 TB): `hyperplane_bands` reduces a D-dim float vector to
  * `bands` fixed-size longs; the near-dup candidate join shuffles only
  * (bands x rows) keys per document, never the pair space. The recall
  * S-curve for a pair at angle theta (p = theta/pi bit-flip probability) is
  *   P(candidate) = 1 - (1 - (1-p)^rows)^bands
  * — at the defaults (64 bands x 12 rows) a sim-0.9 pair is caught with
  * P ~ 1 - 1e-9 while an orthogonal pair collides with P ~ 0.016.
  */
private[graft] object HyperplaneLsh {

  /** bands*rows hyperplanes, each `dim`-dimensional, flattened row-major as
    * plane p = planes[p*dim ... p*dim+dim-1]. Cached per (seed,bands,rows,
    * dim) per JVM — ~1.5 MB at the defaults with dim=256, built once per
    * executor.
    */
  private val cache = new ConcurrentHashMap[(Long, Int, Int, Int), Array[Double]]()

  /** Cache bound: workloads that churn seeds or dims would otherwise pin
    * ~1.5 MB per key for the executor lifetime. Past the bound the cache
    * is simply cleared — plane generation is deterministic and cheap
    * relative to a query, so a rare full rebuild beats LRU bookkeeping on
    * the hot path (the race with concurrent readers is benign: both
    * rebuild identical arrays).
    */
  private val MaxEntries = 8

  def planes(seed: Long, bands: Int, rows: Int, dim: Int): Array[Double] = {
    val key = (seed, bands, rows, dim)
    val hit = cache.get(key)
    if (hit != null) return hit
    val out = new Array[Double](bands * rows * dim)
    var i = 0
    while (i < out.length) {
      // counter-mode splitmix64 -> two uniforms -> Box-Muller normal
      val h1 = SketchHash.mix(seed + SketchHash.Golden * (2L * i + 1))
      val h2 = SketchHash.mix(seed + SketchHash.Golden * (2L * i + 2))
      val u1 = ((h1 >>> 11) + 1).toDouble / (1L << 53).toDouble // (0, 1]
      val u2 = (h2 >>> 11).toDouble / (1L << 53).toDouble       // [0, 1)
      out(i) = math.sqrt(-2.0 * math.log(u1)) * math.cos(2.0 * math.Pi * u2)
      i += 1
    }
    if (cache.size >= MaxEntries) cache.clear()
    cache.put(key, out)
    out
  }
}

/** hashing_tf(tokens, dim): signed feature-hashed term-frequency vector,
  * array<string> -> array<float> of length `dim`. Each token adds +-1 to
  * bucket fnv1a64(token) mod dim, sign from an independent hash bit (the
  * signed variant keeps the inner product unbiased — Weinberger 2009 §3).
  * Not normalized; compose with l2_normalize for cosine use.
  * Null -> null; empty array -> zero vector.
  */
case class HashingTfVector(child: Expression, dim: Int)
    extends UnaryExpression with TokenArrayInput {
  require(dim > 0, "dim must be positive")
  override def prettyName: String = "hashing_tf"
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)

  override def nullSafeEval(v: Any): Any =
    HashingTfVector.compute(v.asInstanceOf[ArrayData], dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HashingTfVector.compute($c, $dim);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object HashingTfVector {
  /** Shared eval/codegen kernel (static forwarder for generated code). */
  def compute(arr: ArrayData, dim: Int): GenericArrayData = {
    val vec = new Array[Float](dim)
    val n = arr.numElements()
    var t = 0
    while (t < n) {
      val h = SketchHash.fnv1a64(arr.getUTF8String(t).getBytes)
      val idx = java.lang.Math.floorMod(h, dim.toLong).toInt
      // sign from a mixed bit stream independent of the bucket index
      val sign = if ((SketchHash.mix(h) & 1L) == 1L) 1f else -1f
      vec(idx) += sign
      t += 1
    }
    new GenericArrayData(vec)
  }
}

/** hyperplane_bands(emb, bands, rows, seed): array<long> of `bands` bucket
  * ids; bucket b packs the sign bits of `rows` Gaussian-hyperplane
  * projections of the embedding. Two embeddings land in the same (band,
  * bucket) iff all `rows` signs in that band agree — the AND-OR
  * amplification of sign-random-projection LSH.
  * Null -> null. The plane matrix is derived from (seed, dim) and cached
  * per JVM, so every vector of a given dimension sees the same
  * hyperplanes. Mixed dimensions in one column each get their own plane
  * set — their signatures are mutually meaningless (cross-dim candidate
  * pairs then fail loudly at the cosine verification's dimension check);
  * keep one dimension per column.
  */
case class HyperplaneBands(child: Expression, bands: Int, rows: Int, seed: Long)
    extends UnaryExpression {
  require(bands > 0 && rows > 0 && rows <= 64,
    "bands must be positive and 1 <= rows <= 64 (bucket bits pack one long)")
  override def prettyName: String = "hyperplane_bands"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    VectorExprUtil.checkVectorTypes(Seq(child), prettyName)

  @transient private lazy val isDouble: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == DoubleType

  override def nullSafeEval(v: Any): Any =
    HyperplaneBands.compute(v.asInstanceOf[ArrayData], isDouble, bands, rows, seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HyperplaneBands.compute($c, $isDouble, $bands, $rows, ${seed}L);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object HyperplaneBands {
  /** Shared eval/codegen kernel (static forwarder for generated code). */
  def compute(arr: ArrayData, isDouble: Boolean, bands: Int, rows: Int,
              seed: Long): GenericArrayData = {
    // one bulk copy to a primitive array: the hot loop below reads it
    // bands*rows times, and per-element ArrayData getters don't inline
    val x: Array[Double] =
      if (isDouble) arr.toDoubleArray()
      else { val f = arr.toFloatArray(); val d = new Array[Double](f.length)
             var i = 0; while (i < f.length) { d(i) = f(i); i += 1 }; d }
    val dim = x.length
    val planes = HyperplaneLsh.planes(seed, bands, rows, dim)
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var bucket = 0L
      var r = 0
      while (r < rows) {
        val off = (b * rows + r) * dim
        var dot = 0.0
        var j = 0
        while (j < dim) {
          dot += x(j) * planes(off + j)
          j += 1
        }
        if (dot >= 0.0) bucket |= (1L << r)
        r += 1
      }
      out(b) = bucket
      b += 1
    }
    new GenericArrayData(out)
  }
}

/** signed_project(emb, k, seed): database-friendly Johnson-Lindenstrauss
  * projection (Achlioptas 2003, "Database-friendly random projections":
  * +-1 entries preserve pairwise distances with the same JL guarantee as
  * Gaussian matrices) of a D-dim float embedding onto k dims — the
  * DATA-INDEPENDENT member of the compressor family (PQ/SQ8 train on the
  * corpus, Matryoshka assumes trained prefix structure; JL needs only a
  * seed, so it applies to a corpus never seen before).
  *
  * Exact-integer contract (the repo's cross-engine posture): each input
  * component is floor-quantized to floor(v * 1024) BEFORE the fold, so
  * y_t = sum_j s(t,j) * floor(v_j * 1024) is exact BIGINT arithmetic —
  * order-independent, hash-stable on any engine. The quantization error
  * (<= 2^-10 per dim) is immaterial for CANDIDATE GENERATION, and the
  * refine stage re-ranks by exact full-precision cosine anyway.
  * Sign s(t,j) = bit 0 of splitmix64(seed + Golden * (t*D + j + 1)) —
  * the HyperplaneLsh counter-mode stream, restatable in oracle SQL.
  *
  * Magnitude: |y_t| <= D * 1024 * max|v|; squared-L2 over k dims stays
  * far inside Long for any real embedding scale (asserted).
  */
case class SignedProject(child: Expression, k: Int, seed: Long)
    extends UnaryExpression {
  require(k >= 1 && k <= 4096, s"signed_project: k must be in [1, 4096], got $k")
  override def prettyName: String = "signed_project"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<float>, got ${other.simpleString}")
  }

  override def nullSafeEval(v: Any): Any =
    SignedProject.compute(v.asInstanceOf[ArrayData], k, seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SignedProject.compute($c, $k, ${seed}L);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object SignedProject {
  /** Shared eval/codegen kernel (static forwarder for generated code). */
  def compute(arr: ArrayData, k: Int, seed: Long): GenericArrayData = {
    val d = arr.numElements()
    val q = new Array[Long](d)
    var j = 0
    while (j < d) {
      q(j) = math.floor(arr.getFloat(j) * 1024.0).toLong
      j += 1
    }
    val out = new Array[Long](k)
    var t = 0
    while (t < k) {
      var acc = 0L
      var idx = t.toLong * d
      j = 0
      while (j < d) {
        val s = SketchHash.mix(seed + SketchHash.Golden * (idx + j + 1))
        acc += (if ((s & 1L) == 1L) q(j) else -q(j))
        j += 1
      }
      out(t) = acc
      t += 1
    }
    new GenericArrayData(out)
  }

  /** Driver-side projection of a probe vector (the embedQuery analogue). */
  def project(v: Array[Float], k: Int, seed: Long): Array[Long] =
    compute(new GenericArrayData(v), k, seed).toLongArray()
}
