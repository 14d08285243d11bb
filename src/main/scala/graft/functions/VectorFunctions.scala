package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over ArrayType(FloatType) embedding columns, as pure
  * codegen-friendly Column expressions (no UDF object churn per row).
  *
  * Determinism contract: dot products are STRICT LEFT FOLDS
  * (`aggregate(zip_with(...))`), mirrored in the DuckDB oracle as
  * `list_reduce(list_transform(...))` — identical operation order means
  * bit-identical IEEE doubles on both engines, so cosine scores can be
  * hash-compared after rounding.
  */
object VectorFunctions {

  /** Cast a float vector to double element-wise (do this once, up front —
    * float accumulation would diverge between engines). */
  def toDoubleVec(v: Column): Column = transform(v, x => x.cast("double"))

  /** Sequential-fold dot product. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm2(a: Column): Column = dot(a, a)

  /** cosine(a, b) = dot / sqrt(|a|² * |b|²), computed entirely in double. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / sqrt(norm2(a) * norm2(b))

  /** Deterministic pseudo-random hyperplane sign for (plane h, dim i):
    * parity of the first md5 byte of "h:i". Pure function of (h, i), so the
    * Spark plan and the DuckDB oracle can share the same literal matrix. */
  def planeSign(h: Int, i: Int): Int = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$h:$i".getBytes("UTF-8"))
    if ((d(0) & 1) == 1) 1 else -1
  }

  /** Random-hyperplane (SimHash-for-vectors) LSH bucket id over `planes`
    * hyperplanes in `dim` dimensions: bit h = [dot(v, plane_h) >= 0].
    * The projection is a fold against a literal ±1 array — a small
    * expression tree that loops at runtime, instead of a dim×planes-term
    * sum that would bloat codegen compilation. */
  def lshBucket(v: Column, planes: Int, dim: Int): Column =
    (0 until planes).map { h =>
      val signs = array((0 until dim).map(i => lit(planeSign(h, i).toDouble)): _*)
      when(dot(v, signs) >= 0, lit(1 << h)).otherwise(lit(0))
    }.reduce(_ + _)
}
