package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}

import graft.plans.{CharNGrams, HyperplaneBucket, JaroWinkler, SimHashBits, SortedIntersectCount, VectorDot}

/** SQL-surface registration for the custom Catalyst expressions, so
  * `spark.sql("SELECT vec_dot(a, b) ...")` works alongside the Column API
  * (the reference's "register your own function" contract,
  * /root/reference/src/mr/function.rs:1, translated to Spark's
  * FunctionRegistry). */
object GraftFunctions {

  private def intLit(e: Expression, name: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$name expects a literal int argument, got $other")
  }

  /** Name → builder for every custom expression; shared by the runtime
    * path (register) and the config path (graft.GraftExtensions). */
  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "vec_dot" -> (exprs => VectorDot(exprs(0), exprs(1))),
    "lsh_bucket" -> (exprs => HyperplaneBucket(exprs(0),
      intLit(exprs(1), "planes"), intLit(exprs(2), "dim"))),
    "jaro_winkler" -> (exprs => JaroWinkler(exprs(0), exprs(1))),
    "simhash32" -> (exprs => SimHashBits(exprs(0))),
    // library-internal contract (sorted distinct inputs) — registered for
    // SQL parity but see SortedIntersectCount's caller contract
    "sorted_intersect_count" -> (exprs => SortedIntersectCount(exprs(0), exprs(1))),
    // table function (Generator): LATERAL VIEW char_ngrams(text, n) t AS gram
    "char_ngrams" -> (exprs => CharNGrams(exprs(0), exprs(1))),
  )

  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    builders.foreach { case (name, builder) =>
      registry.createOrReplaceTempFunction(name, builder, "built-in")
    }
  }
}
