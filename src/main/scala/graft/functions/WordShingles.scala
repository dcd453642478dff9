package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native expression: text → array of word n-gram shingles, in one
  * pass. Semantics identical to
  * `transform(sequence(0, size(toks)-n), i -> concat_ws(' ', slice(toks, i+1, n)))`
  * over the W1-filtered (non-empty) whitespace tokens — but that chain of
  * four interpreted higher-order functions evaluates a closure per
  * element and copies each slice; measured ~1.8 s per pass over sf0.1
  * (260k shingles). This tight loop is ~10× cheaper and is the hot
  * inner operator of every dedup query. Codegen'd (round 8): the loop
  * lives in a static helper the generated code calls, so the
  * SURROUNDING projection (md5 salts, explode input) stays inside one
  * whole-stage span instead of falling back around this expression.
  */
case class WordShingles(child: Expression, n: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  protected override def nullSafeEval(input: Any): Any =
    WordShingles.shingles(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WordShingles.shingles($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

object WordShingles {
  /** Shared by the interpreted path and generated code. */
  def shingles(input: UTF8String, n: Int): GenericArrayData = {
    val text = input.toString
    // tokenize, dropping empty tokens (W1)
    val toks = new scala.collection.mutable.ArrayBuffer[String](32)
    var start = 0
    val len = text.length
    var i = 0
    while (i <= len) {
      if (i == len || text.charAt(i) == ' ') {
        if (i > start) toks += text.substring(start, i)
        start = i + 1
      }
      i += 1
    }
    val m = toks.length - n + 1
    if (m <= 0) new GenericArrayData(Array.empty[Any])
    else {
      val out = new Array[Any](m)
      val sb = new java.lang.StringBuilder(64)
      var j = 0
      while (j < m) {
        sb.setLength(0)
        var k = 0
        while (k < n) {
          if (k > 0) sb.append(' ')
          sb.append(toks(j + k))
          k += 1
        }
        out(j) = UTF8String.fromString(sb.toString)
        j += 1
      }
      new GenericArrayData(out)
    }
  }

  def word_shingles(c: Column, n: Int = 3): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(WordShingles(Bridge.expression(c), n))
  }
}
