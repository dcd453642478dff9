package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared text/vector column builders used by the text-analysis, dedup,
  * and similarity modules. All pure Catalyst expressions (no UDFs) so
  * they stay inside whole-stage codegen and their DuckDB oracle
  * translations are mechanical.
  */
object TextOps {

  /** Non-empty whitespace tokens (W1 semantics: empties filtered). */
  def tokens(text: Column): Column =
    filter(split(text, " ", -1), t => t =!= "")

  /** Word-level 3-gram shingles: L tokens → L-2 shingles; docs shorter
    * than 3 tokens yield none. Shingles, not raw tokens, are the dedup
    * signature unit — they encode local word order.
    */
  def shingles(toks: Column): Column =
    when(size(toks) >= 3,
      transform(sequence(lit(0), size(toks) - 3),
        i => concat_ws(" ", slice(toks, i + 1, lit(3)))))
      .otherwise(array().cast("array<string>"))

  /** Count of tokens that appear in a fixed vocabulary (multiplicity
    * preserved — matches DuckDB `len(list_filter(...))`).
    */
  def vocabHits(toks: Column, vocab: Seq[String]): Column =
    size(filter(toks, t => t.isin(vocab.map(_.asInstanceOf[Any]): _*)))

  /** Exact left-fold dot product of two double arrays. `aggregate` is a
    * sequential left fold, so the summation order is fixed — results
    * are bit-identical to any engine that loops elements in order.
    */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  /** float[] → double[] (exact widening, no rounding). */
  def toDouble(arr: Column): Column = transform(arr, _.cast("double"))
}
