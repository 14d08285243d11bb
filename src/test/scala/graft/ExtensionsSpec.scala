package graft

import org.apache.spark.sql.SparkSession

/** The config-driven registration path: a session built with
  * `spark.sql.extensions=graft.GraftExtensions` must expose the custom
  * SQL functions without any runtime register() call — the way a cluster
  * rollout (SQL gateway, notebook service) enables the library. */
class ExtensionsSpec extends SparkSpec {

  test("GraftExtensions-built session registers vec_dot and lsh_bucket") {
    // force a NEW SparkSession (same SparkContext): extensions only apply
    // at session build, and getOrCreate would return the shared one.
    // spark.sql.extensions is a STATIC conf read from the SparkContext —
    // unsettable on a shared test context — so the spec drives the same
    // injection through Builder.withExtensions, instantiating the class
    // by name exactly as applyExtensions would.
    val prior = spark // initialize the shared session first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val ext = Class.forName("graft.GraftExtensions")
        .getDeclaredConstructor().newInstance()
        .asInstanceOf[org.apache.spark.sql.SparkSessionExtensions => Unit]
      val s = SparkSession.builder()
        .master("local[2]")
        .withExtensions(ext)
        .getOrCreate()
      assert(s ne prior)
      val dot = s.sql(
        "SELECT vec_dot(array(1.0D, 2.0D, 3.0D), array(4.0D, 5.0D, 6.0D)) AS d")
        .head().getDouble(0)
      assert(dot == 32.0)
      val bucket = s.sql(
        "SELECT lsh_bucket(array(1.0D, -1.0D), 4, 2) AS b").head().getInt(0)
      assert(bucket >= 0 && bucket < 16)
      val jw = s.sql(
        "SELECT jaro_winkler('martha', 'marhta') AS j").head().getDouble(0)
      assert(math.abs(jw - 0.9611111111) < 1e-9)
      val sh = s.sql(
        "SELECT simhash32(array(3L, 3L, 1L)) AS h").head().getLong(0)
      assert(sh == 3L) // bits 0 and 1 both carry 2-of-3 majorities
      val sic = s.sql(
        "SELECT sorted_intersect_count(array(1L, 3L, 5L), array(3L, 4L, 5L)) AS c")
        .head().getInt(0)
      assert(sic == 2)
    } finally {
      SparkSession.setDefaultSession(prior)
      SparkSession.setActiveSession(prior)
    }
  }
}
