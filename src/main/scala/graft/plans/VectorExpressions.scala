package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftColumnBridge.{column, expression, AbstractType}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, LongType}

import graft.functions.VectorFunctions

/** Native Catalyst expressions for the vector hot paths (SURVEY.md §4.3
  * allowed these as fallback; measured need, not speculation):
  *
  *  - `VectorDot` replaces the `aggregate(zip_with(...))` fold. The fold
  *    works but each evaluation allocates a zipped intermediate array and
  *    the 8-projection LSH variant produced a codegen tree large enough
  *    that janino compilation dominated the query (~6 s for 2000 rows).
  *    Here `doGenCode` emits one tight primitive loop.
  *  - `HyperplaneBucket` evaluates all `planes` signed projections in one
  *    pass with a precomputed sign matrix (CodegenFallback — its eval is
  *    a primitive double loop; nothing to gain from codegen).
  *
  * Determinism contract: both run strict sequential accumulation in
  * element order — identical IEEE doubles to the previous fold AND to the
  * DuckDB oracle's `list_reduce`, so oracle hashes are unchanged.
  */
case class VectorDot(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes with CodegenFallback {

  override def dataType: DataType = DoubleType

  /** Declared element type is load-bearing, not documentation: ArrayData
    * .getDouble reads raw 8-byte slots, so an un-cast array<float> column
    * (the schema's native embedding type) would yield silent garbage.
    * Declaring array<double> makes the analyzer insert the float→double
    * cast (or fail for non-castable types) before eval ever runs. */
  override def inputTypes: Seq[AbstractType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n)
      throw new IllegalArgumentException(
        s"vec_dot: dimension mismatch ($n vs ${y.numElements()})")
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = $a.numElements();
         |if ($b.numElements() != $n) {
         |  throw new IllegalArgumentException(
         |    "vec_dot: dimension mismatch (" + $n + " vs " + $b.numElements() + ")");
         |}
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VectorDot =
    copy(left = newLeft, right = newRight)
}

/** LSH bucket id over `planes` md5-derived random hyperplanes (shared sign
  * matrix with VectorFunctions.planeSign / the DuckDB oracle literals). */
case class HyperplaneBucket(child: Expression, planes: Int, dim: Int)
    extends UnaryExpression with ImplicitCastInputTypes with CodegenFallback {

  override def dataType: DataType = IntegerType

  /** See VectorDot.inputTypes — same getDouble-on-float-storage hazard. */
  override def inputTypes: Seq[AbstractType] = Seq(ArrayType(DoubleType))

  @transient private lazy val signs: Array[Array[Double]] =
    Array.tabulate(planes, dim)((h, i) => VectorFunctions.planeSign(h, i).toDouble)

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = math.min(v.numElements(), dim)
    var bucket = 0
    var h = 0
    while (h < planes) {
      val row = signs(h)
      var s = 0.0
      var i = 0
      while (i < n) { s += row(i) * v.getDouble(i); i += 1 }
      if (s >= 0) bucket |= 1 << h
      h += 1
    }
    bucket
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBucket =
    copy(child = newChild)
}

/** Count of common elements between two SORTED, DISTINCT long arrays —
  * the verification kernel of a set-similarity join. `array_intersect`
  * answers the same question by building a per-pair hash set and
  * materializing the intersection *array*, only for `size(...)` to throw
  * it away; over the ~10⁵ candidate pairs a blocked Jaccard join emits,
  * that is the dominant cost. A merge scan over arrays sorted once per
  * document is allocation-free and branch-predictable.
  *
  * Caller contract: both inputs strictly ascending (sorted, no
  * duplicates) — the gram sets are built sorted at the source. The merge
  * scan CHECKS the contract on every element it visits (one extra
  * comparison per step) and throws instead of silently undercounting:
  * the consumers are dedup decisions, where a silent undercount means
  * silently missed duplicate pairs. Elements past the shorter side's
  * exhaustion are not visited and not checked — they cannot affect the
  * count.
  *
  * Why not prefix-filtering (PPJoin/VCL-style) instead: measured on this
  * corpus the frequency-ordered prefix index prunes nothing (159,213
  * candidates vs 159,293 block pairs — a 2,041-gram universe means every
  * same-block pair shares prefix tokens), so the win is in making each
  * verification cheap, not in generating fewer of them. */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def dataType: DataType = IntegerType

  override def inputTypes: Seq[AbstractType] =
    Seq(ArrayType(LongType), ArrayType(LongType))

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements()
    val ny = y.numElements()
    var i = 0
    var j = 0
    var c = 0
    def unsorted(): Nothing = throw new IllegalArgumentException(
      "sorted_intersect_count: input not strictly ascending — caller contract violated")
    while (i < nx && j < ny) {
      val xv = x.getLong(i)
      val yv = y.getLong(j)
      if (xv == yv) {
        if (i + 1 < nx && x.getLong(i + 1) <= xv) unsorted()
        if (j + 1 < ny && y.getLong(j + 1) <= yv) unsorted()
        c += 1; i += 1; j += 1
      } else if (xv < yv) {
        if (i + 1 < nx && x.getLong(i + 1) <= xv) unsorted()
        i += 1
      } else {
        if (j + 1 < ny && y.getLong(j + 1) <= yv) unsorted()
        j += 1
      }
    }
    c
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |int $nx = $a.numElements();
         |int $ny = $b.numElements();
         |int $i = 0; int $j = 0; int $c = 0;
         |while ($i < $nx && $j < $ny) {
         |  long $xv = $a.getLong($i);
         |  long $yv = $b.getLong($j);
         |  if ($xv == $yv) {
         |    if ($i + 1 < $nx && $a.getLong($i + 1) <= $xv) throw new IllegalArgumentException("sorted_intersect_count: input not strictly ascending — caller contract violated");
         |    if ($j + 1 < $ny && $b.getLong($j + 1) <= $yv) throw new IllegalArgumentException("sorted_intersect_count: input not strictly ascending — caller contract violated");
         |    $c++; $i++; $j++;
         |  } else if ($xv < $yv) {
         |    if ($i + 1 < $nx && $a.getLong($i + 1) <= $xv) throw new IllegalArgumentException("sorted_intersect_count: input not strictly ascending — caller contract violated");
         |    $i++;
         |  } else {
         |    if ($j + 1 < $ny && $b.getLong($j + 1) <= $yv) throw new IllegalArgumentException("sorted_intersect_count: input not strictly ascending — caller contract violated");
         |    $j++;
         |  }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}

/** 32-bit SimHash from an array of 32-bit token hashes in ONE array pass.
  * The Column formulation (32 independent `size(filter(vals, bit-test))`
  * trees) re-traverses the token array 32× with lambda-eval overhead per
  * element; here the bit counters accumulate in a single primitive loop —
  * same majority-vote semantics (bit b set iff 2·count(b) > n), bit-equal
  * to the previous formulation and to the DuckDB oracle. */
case class SimHashBits(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def dataType: DataType = LongType

  override def inputTypes: Seq[AbstractType] = Seq(ArrayType(LongType))

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    val cnt = new Array[Long](32)
    var i = 0
    while (i < n) {
      val v = x.getLong(i)
      var b = 0
      while (b < 32) { cnt(b) += (v >> b) & 1L; b += 1 }
      i += 1
    }
    var r = 0L
    var b = 0
    while (b < 32) { if (2 * cnt(b) > n) r |= 1L << b; b += 1 }
    r
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val cnt = ctx.freshName("cnt")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val v = ctx.freshName("v")
      val r = ctx.freshName("r")
      s"""
         |int $n = $a.numElements();
         |long[] $cnt = new long[32];
         |for (int $i = 0; $i < $n; $i++) {
         |  long $v = $a.getLong($i);
         |  for (int $b = 0; $b < 32; $b++) { $cnt[$b] += ($v >> $b) & 1L; }
         |}
         |long $r = 0L;
         |for (int $b = 0; $b < 32; $b++) {
         |  if (2L * $cnt[$b] > $n) { $r |= 1L << $b; }
         |}
         |${ev.value} = $r;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHashBits =
    copy(child = newChild)
}

object VectorExpressions {
  /** Column wrappers (the public library surface for these expressions). */
  def vec_dot(a: Column, b: Column): Column =
    column(VectorDot(expression(a), expression(b)))

  def vec_cosine(a: Column, b: Column): Column = {
    import org.apache.spark.sql.functions.sqrt
    vec_dot(a, b) / sqrt(vec_dot(a, a) * vec_dot(b, b))
  }

  def lsh_bucket(v: Column, planes: Int, dim: Int): Column =
    column(HyperplaneBucket(expression(v), planes, dim))

  def sorted_intersect_count(a: Column, b: Column): Column =
    column(SortedIntersectCount(expression(a), expression(b)))

  def simhash32(vals: Column): Column =
    column(SimHashBits(expression(vals)))
}
