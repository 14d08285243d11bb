package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Config-driven registration: `--conf spark.sql.extensions=graft.GraftExtensions`
  * injects the custom expressions into every session on the cluster at
  * build time — the deployment path for clusters where user code never
  * calls GraftFunctions.register explicitly (notebooks, SQL gateways,
  * Thrift server). Same builders as GraftFunctions; the two paths cannot
  * drift. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.builders.foreach { case (name, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft.plans", name), builder))
    }
}
