package graft

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}

import graft.functions.{DotProduct, DoubleSortableBits, Md5PrefixLong, RollingHash, TokenCount, TokenCountRewrite, WordShingles}

/** Session extension registering graft's native expressions as SQL
  * functions, so the SQL-string surface can use them:
  *
  * {{{
  * SparkSession.builder().withExtensions(new GraftExtensions) ...
  * // or on an existing session:
  * GraftExtensions.register(spark)
  * spark.sql("SELECT rolling_hash(text), word_shingles(text, 3) FROM docs")
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  def apply(e: SparkSessionExtensions): Unit = {
    GraftExtensions.functionDefs.foreach(e.injectFunction)
    e.injectOptimizerRule(_ => TokenCountRewrite)
  }
}

object GraftExtensions {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft.functions", null, name, usage, "")

  val functionDefs: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] =
    Seq(
      (FunctionIdentifier("rolling_hash"),
        info("rolling_hash", "rolling_hash(str) - 64-bit polynomial rolling hash"),
        (exprs: Seq[Expression]) => RollingHash(exprs.head)),
      (FunctionIdentifier("word_shingles"),
        info("word_shingles", "word_shingles(str[, n]) - word n-gram shingles (default n=3)"),
        (exprs: Seq[Expression]) => exprs match {
          case Seq(c) => WordShingles(c, 3)
          case Seq(c, n) if n.foldable =>
            n.eval(null) match {
              case num: Number => WordShingles(c, num.intValue())
              case _ => throw new IllegalArgumentException(
                "word_shingles: n must be a non-null integer literal")
            }
          case _ => throw new IllegalArgumentException(
            "word_shingles(str[, n]) — n must be a foldable integer")
        }),
      (FunctionIdentifier("dot_product"),
        info("dot_product", "dot_product(arr, arr) - sequential double dot product"),
        (exprs: Seq[Expression]) => DotProduct(exprs(0), exprs(1))),
      (FunctionIdentifier("md5_prefix_long"),
        info("md5_prefix_long", "md5_prefix_long(str) - first 8 md5 bytes as big-endian long"),
        (exprs: Seq[Expression]) => Md5PrefixLong(exprs.head)),
      (FunctionIdentifier("token_count"),
        info("token_count", "token_count(str) - non-empty space-separated token count"),
        (exprs: Seq[Expression]) => TokenCount(exprs.head)),
      (FunctionIdentifier("double_sortable_bits"),
        info("double_sortable_bits",
          "double_sortable_bits(dbl) - order-preserving bit image of a double"),
        (exprs: Seq[Expression]) => DoubleSortableBits(exprs.head)),
      (FunctionIdentifier("interleave_bits"),
        info("interleave_bits",
          "interleave_bits(x, y) - Morton/Z-order interleave of two 16-bit values"),
        (exprs: Seq[Expression]) => {
          // arity-check here so `interleave_bits(x)` fails analysis
          // with a real error instead of IndexOutOfBoundsException
          if (exprs.length != 2)
            throw new org.apache.spark.sql.AnalysisException(
              errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
              messageParameters = Map(
                "functionName" -> "`interleave_bits`",
                "expectedNum" -> "2",
                "actualNum" -> exprs.length.toString,
                "docroot" -> "https://spark.apache.org/docs/latest"))
          graft.functions.InterleaveBits(exprs(0), exprs(1))
        }),
      (FunctionIdentifier("hilbert_index"),
        info("hilbert_index",
          "hilbert_index(x, y) - order-16 Hilbert-curve index of two 16-bit values"),
        (exprs: Seq[Expression]) => {
          if (exprs.length != 2)
            throw new org.apache.spark.sql.AnalysisException(
              errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
              messageParameters = Map(
                "functionName" -> "`hilbert_index`",
                "expectedNum" -> "2",
                "actualNum" -> exprs.length.toString,
                "docroot" -> "https://spark.apache.org/docs/latest"))
          graft.functions.HilbertIndex(exprs(0), exprs(1))
        })
    )

  /** Register on an already-built session (the driver owns session
    * construction, so injection-at-build isn't always available).
    * Installs the SQL functions AND the [[TokenCountRewrite]] optimizer
    * rule (via `experimental.extraOptimizations`, the post-build
    * injection point).
    */
  def register(spark: SparkSession): Unit = {
    val registry = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
    functionDefs.foreach { case (ident, inf, builder) =>
      registry.registerFunction(ident, inf, builder)
    }
    val opts = spark.experimental.extraOptimizations
    if (!opts.contains(TokenCountRewrite))
      spark.experimental.extraOptimizations = opts :+ TokenCountRewrite
  }
}
