package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.GraftExpressions

/** Library packaging of the custom kernels: set
  * `spark.sql.extensions=graft.GraftExtensions` on the session builder
  * (or spark-submit conf) and every session gets the `graft_*`
  * functions without any imperative `register` call — the standard way
  * a Spark library ships engine extensions.
  *
  * Both routes iterate the SAME [[GraftExpressions.builders]] list, so
  * they cannot drift; injected functions are session-isolated exactly
  * like temp functions.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(e: SparkSessionExtensions): Unit = {
    GraftExpressions.builders.foreach { case (name, usage, builder) =>
      e.injectFunction((FunctionIdentifier(name),
        // the full 11-arg ctor is the only non-deprecated one that
        // carries usage; empty strings are the documented "absent" form
        new ExpressionInfo(classOf[GraftExtensions].getName, "", name, usage,
          "", "", "", "", "", "", "built-in"),
        builder))
    }
    // plan rewrites: size(array_intersect(…)) → one-pass count kernel
    e.injectOptimizerRule(_ => IntersectCountRewrite)
  }
}
