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

  /** Word-level 3-gram shingles straight from the text column:
    * L tokens → L-2 shingles; docs shorter than 3 tokens yield none.
    * Shingles, not raw tokens, are the dedup signature unit — they
    * encode local word order. Backed by the native
    * [[graft.functions.WordShingles]] expression (the equivalent
    * transform/slice/concat_ws HOF chain costs ~10× more per pass).
    */
  def shinglesOf(text: Column): Column =
    graft.functions.WordShingles.word_shingles(text, 3)

  /** Count of tokens that appear in a fixed vocabulary (multiplicity
    * preserved — matches DuckDB `len(list_filter(...))`).
    */
  def vocabHits(toks: Column, vocab: Seq[String]): Column =
    size(filter(toks, t => t.isin(vocab: _*)))

  /** Exact left-to-right dot product of two double arrays (native
    * [[graft.functions.DotProduct]]; fixed summation order keeps
    * results bit-identical to any engine that loops in order).
    */
  def dot(a: Column, b: Column): Column =
    graft.functions.DotProduct.dot_product(a, b)

  /** float[] → double[] (exact widening, no rounding). */
  def toDouble(arr: Column): Column = transform(arr, _.cast("double"))
}
