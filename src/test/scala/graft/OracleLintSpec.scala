package graft

import org.scalatest.funsuite.AnyFunSuite

/** The determinism doctrine as a failing test, not a memory
  * (round-9 mandate): NO libm transcendental may appear in any
  * cross-engine oracle contract. libm `ln`/`exp`/`log`/`pow` are not
  * correctly rounded — the JVM and DuckDB may differ by an ulp, and a
  * `floor`/`round` one ulp from a boundary flips the oracle hash on
  * the next testdata refresh (how `pipe_drift_psi` failed in round 7,
  * and the flap risk the round-8 verdict flagged in the quality-LR /
  * dsir / entropy / bm25-log contracts). Those rows now use the
  * deterministic fixed-point `log2micro` (`Log2MicroSpec`) or pure
  * integer/rational arithmetic, and this spec keeps every future row
  * honest.
  *
  * `sqrt` is deliberately NOT banned: IEEE 754 requires sqrt to be
  * correctly rounded (it is in the basic-operation set with +,−,×,÷),
  * so both engines produce the identical double — the similarity
  * family's norms depend on exactly that guarantee.
  *
  * Allowlist: empty. If a future row genuinely needs a transcendental
  * cross-engine, the sanctioned patterns are (a) re-express via
  * log2micro, or (b) keep the float single-engine (integer-only
  * oracle + ScalaTest epsilon pin) and add the row HERE with a
  * justification comment.
  */
class OracleLintSpec extends AnyFunSuite {

  private val banned =
    raw"(?i)(?<![a-z0-9_])(ln|log|log2|log10|log1p|exp|exp2|expm1|pow|power|sin|cos|tan|asin|acos|atan|atan2|sinh|cosh|tanh|cbrt|gamma|lgamma)\s*\(".r

  private val allowlist: Map[String, String] = Map.empty

  test("no libm transcendental in any oracleSql contract") {
    val offenders = SparkEntry.oracleSql.toSeq.sortBy(_._1).flatMap {
      case (name, sql) if !allowlist.contains(name) =>
        val hits = banned.findAllMatchIn(sql).map(_.group(1)).toSeq.distinct
        if (hits.nonEmpty) Some(s"$name -> ${hits.mkString(", ")}") else None
      case _ => None
    }
    assert(offenders.isEmpty,
      s"transcendentals found in oracle contracts:\n  ${offenders.mkString("\n  ")}")
  }

  test("every allowlisted row still exists (no stale exemptions)") {
    val stale = allowlist.keys.filterNot(SparkEntry.oracleSql.contains)
    assert(stale.isEmpty, s"stale allowlist entries: ${stale.mkString(", ")}")
  }
}
