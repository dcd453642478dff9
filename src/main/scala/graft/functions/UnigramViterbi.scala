package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: optimal unigram-tokenizer segmentation
  * cost of a string by Viterbi dynamic programming over a FIXED piece
  * vocabulary — the serving shape of a SentencePiece-style unigram
  * model (scores are a broadcast constant table; segmentation is a
  * narrow per-row scan — the ta_quality_lr "fixed weights = trained
  * model at serving time" doctrine applied to tokenization).
  *
  * Cost model (integer, engine-exact): each piece costs
  * 10⁶ + rank(piece), rank 1-based by corpus frequency. Minimizing the
  * total therefore minimizes the PIECE COUNT first (the MDL objective
  * a unigram tokenizer approximates) and prefers more-frequent pieces
  * among equal-length segmentations. The returned long encodes the
  * unique optimum value as 10⁶·n_pieces + Σrank (rank sums stay far
  * below 10⁶ by construction: ≤ maxChars ranks of ≤ vocab size); the
  * DP VALUE is unique even where the argmin path is not, so the
  * contract is deterministic.
  *
  * O(len · maxPieceLen) per row, no allocation beyond the dp array;
  * `doGenCode` keeps it inside whole-stage codegen with the vocab map
  * attached as a codegen reference object.
  */
case class UnigramViterbi(child: Expression, vocab: Map[String, Int],
                          maxPieceLen: Int, maxChars: Int)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "unigram_viterbi"

  protected override def nullSafeEval(input: Any): Any =
    UnigramViterbi.segmentCost(input.asInstanceOf[UTF8String].toString,
      vocab, maxPieceLen, maxChars)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val vocabRef = ctx.addReferenceObj("vocab", vocab,
      "scala.collection.immutable.Map")
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.functions.UnigramViterbi.segmentCost(
         |  $c.toString(), $vocabRef, $maxPieceLen, $maxChars);""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): UnigramViterbi =
    copy(child = newChild)
}

object UnigramViterbi {

  private val Inf = Long.MaxValue / 4

  /** Shared by the interpreted path and generated code. Returns
    * 10⁶·n_pieces + Σrank of the minimum-cost segmentation of the
    * first `maxChars` characters, or [[Inf]]/4-scale sentinel only if
    * some character is absent from the vocabulary (callers build the
    * vocab to include every single character, so segmentation always
    * exists).
    */
  def segmentCost(text: String, vocab: Map[String, Int],
                  maxPieceLen: Int, maxChars: Int): Long = {
    val s = if (text.length > maxChars) text.substring(0, maxChars) else text
    val n = s.length
    val dp = new Array[Long](n + 1)
    var j = 1
    while (j <= n) {
      dp(j) = Inf
      var l = 1
      while (l <= maxPieceLen && l <= j) {
        if (dp(j - l) < Inf) {
          vocab.get(s.substring(j - l, j)) match {
            case Some(rank) =>
              val c = dp(j - l) + 1000000L + rank
              if (c < dp(j)) dp(j) = c
            case None =>
          }
        }
        l += 1
      }
      j += 1
    }
    dp(n)
  }

  /** Column API (classic-session Expression↔Column bridge). */
  def unigram_viterbi(c: Column, vocab: Map[String, Int],
                      maxPieceLen: Int, maxChars: Int): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(UnigramViterbi(Bridge.expression(c), vocab,
      maxPieceLen, maxChars))
  }
}
