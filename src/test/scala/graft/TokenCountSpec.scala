package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TokenCount
import graft.operators.TextOps

/** TokenCount native expression + its optimizer rewrite: the rule must
  * fire on the `size(filter(split))` tokenizer-count pattern and be
  * result-identical to the array form on every input.
  */
class TokenCountSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.session
  val sf = "/root/testdata/sf0.001"
  import spark.implicits._

  private val texts: Gen[String] =
    Gen.listOf(Gen.oneOf(Gen.const(" "), Gen.alphaNumStr.map(_.take(5))))
      .map(_.mkString)

  test("token_count equals size(filter(split)) on arbitrary strings") {
    val prop = Prop.forAll(Gen.listOfN(50, texts)) { samples =>
      val all = samples ++ Seq("", " ", "  ", "a", " a ", "a  b", "a b c ")
      val df = all.toDF("text").select(
        TokenCount.token_count(col("text")).as("fast"),
        size(filter(split(col("text"), " ", -1), t => t =!= "")).as("slow"))
      df.filter(col("fast") =!= col("slow")).count() == 0
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(5), prop)
    assert(res.passed, res.status.toString)
  }

  test("optimizer rule rewrites the registered queries' token counts") {
    // TestSpark registers the rule; ta_tokens counts tokens via the
    // HOF pattern, so its optimized plan must carry token_count.
    val df = Tables.documents(spark, sf)
      .select(col("doc_id"), size(TextOps.tokens(col("text"))).as("n"))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("token_count"), s"rule did not fire:\n$optimized")
    // and the rewritten result matches the un-rewritten semantics
    val viaArray = Tables.documents(spark, sf)
      .select(col("doc_id"),
        size(filter(split(col("text"), " ", -1), t => concat(t, lit("")) =!= ""))
          .as("n")) // concat defeats the pattern match → no rewrite
    assert(!viaArray.queryExecution.optimizedPlan.toString.contains("token_count"))
    assert(df.orderBy("doc_id").collect().toSeq ==
      viaArray.orderBy("doc_id").collect().toSeq)
  }

  test("token_count is registered as a SQL function") {
    val n = Graft.sql(spark, sf,
      "SELECT token_count('a  bb c') AS n").head().getInt(0)
    assert(n == 3)
  }
}
