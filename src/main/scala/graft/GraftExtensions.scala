package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.GraftExpressions

/** Library packaging of the custom kernels: set
  * `spark.sql.extensions=graft.GraftExtensions` on the session builder
  * (or spark-submit conf) and every session gets the `graft_*`
  * functions without any imperative `register` call — the standard way
  * a Spark library ships engine extensions.
  *
  * The same builders back `GraftExpressions.register`, so the two
  * routes are interchangeable; injected functions are session-isolated
  * exactly like temp functions.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((FunctionIdentifier("graft_dot"),
      info("graft_dot", "graft_dot(a, b) - left-to-right dot product of two double arrays"),
      (exprs: Seq[Expression]) => GraftExpressions.DotProductD(exprs(0), exprs(1))))
    e.injectFunction((FunctionIdentifier("graft_shingles"),
      info("graft_shingles", "graft_shingles(text, n) - distinct word n-gram shingles"),
      (exprs: Seq[Expression]) =>
        GraftExpressions.WordShingles(exprs(0), GraftExpressions.intLitArg(exprs(1), "n"))))
    e.injectFunction((FunctionIdentifier("graft_minhash"),
      info("graft_minhash", "graft_minhash(shingles, k) - Carter-Wegman MinHash signature"),
      (exprs: Seq[Expression]) =>
        GraftExpressions.MinHashSig(exprs(0), GraftExpressions.intLitArg(exprs(1), "k"))))
    e.injectFunction((FunctionIdentifier("graft_simhash"),
      info("graft_simhash", "graft_simhash(tokens, bits) - sign-of-sums SimHash"),
      (exprs: Seq[Expression]) =>
        GraftExpressions.SimHashSig(exprs(0), GraftExpressions.intLitArg(exprs(1), "bits"))))
    e.injectFunction((FunctionIdentifier("graft_bytehist"),
      info("graft_bytehist", "graft_bytehist(bin) - byte histogram stats (n, distinct, maxc, coll)"),
      (exprs: Seq[Expression]) => GraftExpressions.ByteHistStats(exprs(0))))
  }
}
