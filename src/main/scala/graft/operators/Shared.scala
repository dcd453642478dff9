package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Column helpers and DuckDB-oracle SQL snippets shared across query
  * modules. One definition per cross-engine idiom, so the Spark
  * expression and its SQL mirror can't drift apart per-module.
  */
object Agg {
  /** Exact order-independent sum of a double measure: decimal-sum then
    * back to double (see SCALE.md determinism rules).
    */
  def dsum(c: Column): Column = sum(c.cast(DecimalType(18, 4))).cast("double")
}

object Vec {
  /** Sign-bit LSH bucket over the first `bits` embedding dimensions. */
  def signBucket(embedding: Column, bits: Int = 8): Column =
    concat((1 to bits).map(i =>
      when(element_at(embedding, i) >= 0, "1").otherwise("0")): _*)
}

object OracleSql {
  /** W1-filtered whitespace tokens of `text`. */
  val toks = "list_filter(string_split(text, ' '), x -> x <> '')"

  /** DuckDB mirror of [[Agg.dsum]]. */
  def dsum(x: String): String = s"CAST(sum(CAST($x AS DECIMAL(18,4))) AS DOUBLE)"

  /** DuckDB mirror of the embeddings CTE used by the vector queries:
    * (vec_id, e double[], bucket sign-bits, nrm).
    */
  val vectors: String = {
    val bits = (1 to 8)
      .map(i => s"CASE WHEN embedding[$i] >= 0 THEN '1' ELSE '0' END")
      .mkString(",\n      ")
    s"""SELECT vec_id, embedding::DOUBLE[] AS e,
       |    concat(
       |      $bits) AS bucket,
       |    sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
       |  FROM embeddings""".stripMargin
  }
}
