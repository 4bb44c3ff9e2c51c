package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session-extension entry point: enable with
  * `spark.sql.extensions=graft.plans.GraftExtensions` (or
  * `.withExtensions(new GraftExtensions)`). Injects the engine's native
  * functions into every new session — the standard deployment path for
  * custom Catalyst pieces (SURVEY §4: custom work is function-level; no
  * custom Rule/Strategy is needed for parity, so none is installed).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_rolling_hash"),
      new ExpressionInfo(classOf[RollingHashExpr].getName, "graft_rolling_hash"),
      (children: Seq[Expression]) => RollingHashExpr(children.head)))
    ext.injectFunction((
      FunctionIdentifier("graft_minhash_sigs"),
      new ExpressionInfo(classOf[MinHashSigsExpr].getName, "graft_minhash_sigs"),
      (children: Seq[Expression]) => MinHashSigsExpr(
        children.head,
        children(1).eval().asInstanceOf[Number].intValue())))
    ext.injectFunction((
      FunctionIdentifier("graft_simhash"),
      new ExpressionInfo(classOf[SimHashExpr].getName, "graft_simhash"),
      (children: Seq[Expression]) => SimHashExpr(
        children.head,
        children(1).eval().asInstanceOf[Number].intValue())))
    ext.injectFunction((
      FunctionIdentifier("graft_nfc"),
      new ExpressionInfo(classOf[NfcNormalizeExpr].getName, "graft_nfc"),
      (children: Seq[Expression]) => NfcNormalizeExpr(children.head)))
    ext.injectFunction((
      FunctionIdentifier("graft_clean"),
      new ExpressionInfo(classOf[CleanTextExpr].getName, "graft_clean"),
      (children: Seq[Expression]) => CleanTextExpr(
        children.head,
        children.length > 1 &&
          children(1).eval().asInstanceOf[Boolean])))
  }
}
