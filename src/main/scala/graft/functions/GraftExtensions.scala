package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** SparkSessionExtensions injector for the engine's native expressions —
  * the cluster-scale registration path the temp-function registry in
  * [[VectorFunctions.register]] stands in for during tests:
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.functions.GraftExtensions ...
  * }}}
  *
  * makes `graft_vec_dot`, `graft_shingle_hashes` and `graft_minhash_sig`
  * available in every session (SQL and DataFrame `call_function`) without
  * any per-session setup — the similarity/dedup pipelines then work from
  * pure SQL (e.g. Spark Thrift / Connect clients), matching how the
  * reference exposes its whole surface through SQL Server.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    (VectorFunctions.builders ++ BloomFunctions.builders)
      .foreach { case (name, cls, builder) =>
        ext.injectFunction((
          FunctionIdentifier(name), new ExpressionInfo(cls.getName, name), builder))
      }
    // bounded edit-distance rewrites (length prefilter + banded DP)
    ext.injectOptimizerRule(_ => graft.plans.LevenshteinPrefilter)
  }
}
