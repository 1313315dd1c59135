package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

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

  private def intArg(e: Expression): Int =
    e.eval(null).asInstanceOf[Number].intValue()

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier(VectorFunctions.DOT),
      new ExpressionInfo(classOf[VecDot].getName, VectorFunctions.DOT),
      (exprs: Seq[Expression]) => VecDot(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier(VectorFunctions.SHINGLES),
      new ExpressionInfo(classOf[ShingleHashes].getName, VectorFunctions.SHINGLES),
      (exprs: Seq[Expression]) => ShingleHashes(exprs(0), intArg(exprs(1)))))
    ext.injectFunction((
      FunctionIdentifier(VectorFunctions.MINHASH),
      new ExpressionInfo(classOf[MinHashSig].getName, VectorFunctions.MINHASH),
      (exprs: Seq[Expression]) => MinHashSig(exprs(0), intArg(exprs(1)))))
  }
}
