package graft

import org.scalatest.funsuite.AnyFunSuite

/** The integer-domain doctrine as a failing test (round-11 verdict
  * #1) — the last eyeball-enforced audit mechanized on the
  * [[CollectLintSpec]]/[[OracleLintSpec]] pattern.
  *
  * The cliff class: `x * 10⁶` in BIGINT wraps silently past
  * x ≈ 9.2·10¹² — reachable for CORPUS-COUNT quantities (events,
  * tokens, pair counts) at 100 TB, where Spark wraps while DuckDB
  * raises, an engine-divergence the oracle gate cannot see until it
  * fires. The sanctioned shape is routing the multiply through
  * DECIMAL(38,0)/HUGEINT and casting back to BIGINT only at a
  * bounded output edge (where ANSI/HUGEINT casts fail loudly on both
  * engines) — rand_ppm, ev_did, ev_cusum, ev_gini, ev_benford,
  * ta_rake, ss_ivf_occupancy, pipe_mix_temperature all ride it.
  *
  * This spec enumerates every OTHER `·10⁶` multiply in main source —
  * Scala AND the SQL strings, comments stripped — and requires each
  * file's residue to be allowlisted with its bounded-domain
  * justification. Auto-passed without an entry:
  *   - lines carrying DECIMAL/HUGEINT (the routing is line-local);
  *   - literal×literal time constants (`15L * 60 * 1000000`).
  * Counts are exact on purpose: a NEW micro cross-multiply in an
  * already-listed file must come back here and justify its own bound
  * (or route through DECIMAL and skip the list entirely).
  */
class MicroDomainLintSpec extends AnyFunSuite {

  // integer micro literal: [digits]1000000[L], not part of a longer
  // number and not a float literal (1000000.0 quantizes bounded
  // unit-scale doubles — not the integer-wrap class)
  private val lit = raw"\d*1000000L?(?![\d.])"
  private val site = (raw"\*\s*" + lit + raw"|" + lit + raw"\s*\*").r
  // constant×constant: the operand adjacent to the multiply is itself
  // a numeric literal (or CAST(<literal> AS BIGINT))
  private val litAdjacent =
    (raw"(\d[\dL]*|CAST\(\s*\d+\s+AS\s+BIGINT\s*\))\s*\*\s*" + lit +
      raw"|" + lit + raw"\s*\*\s*\d[\dL]*(?![\w])").r
  private val routed = raw"(?i)DECIMAL|HUGEINT".r

  /** file (relative to src/main/scala/graft) -> (exact unrouted-site
    * count, why each is bounded). Bounds quoted at the 100 TB design
    * point (~2·10¹⁰ docs, ~10¹³ events/tokens, ~10¹⁰ users).
    */
  private val allowed: Map[String, (Int, String)] = Map(
    "operators/DedupClusters.scala" -> (6,
      "ARI/Rand ppm quotients: operands are DECIMAL(38,0)/HUGEINT via the CAST on the OPENING line of the same multi-line expression — line-local detection sees only the continuation"),
    "operators/EventQueries.scala" -> (43,
      "three classes: (a) multi-line DECIMAL/HUGEINT-routed continuations (gini, cuped, bootstrap, power-MDE, acf, ewma, cusum k_micro); (b) user/DAU/cohort-count numerators bounded by user cardinality ~1e10 << 9.2e12; (c) per-(type,hour)/calendar-frame cell counts and covered-micros <= 3.6e9 per hour"),
    "operators/Multimodal.scala" -> (6,
      "per-image pixel-energy sums and per-clip sample counts (media-file-bounded <= ~1e9); the deflate energy ratio, the Otsu score cross-multiply (num^2 ~ 255^2*n^4) and the pitch normalized peak are explicitly BigInt-routed — arbitrary precision, cannot wrap"),
    "operators/PipelineQueries.scala" -> (17,
      "per-label/class/cluster DOC counts (~2e10 docs << 9.2e12), per-shard byte fills bounded by the pack target, and exp2micro outputs e2m <= 1e6 (a share^0.3 in micro)"),
    "operators/PrefQueries.scala" -> (1,
      "Bradley-Terry tie split: per-pair preference count <= n_users ~1e10 times the event-type-vocabulary constant — product ~1e17 < 9.2e18"),
    "operators/QualityQueries.scala" -> (14,
      "per-doc token/char ratios (doc-length-bounded <= ~1e8) and doc-count/labeled-sample numerators (~2e10 << 9.2e12)"),
    "operators/Similarity.scala" -> (1,
      "rebalance-to-quiescence worst-cell ppm: explicitly BigInt-routed (arbitrary precision, cannot wrap), computed driver-side on a 1-row census head"),
    "operators/Shared.scala" -> (2,
      "log2micro/exp2micro SQL CTE internals: fixed-point domain-capped by contract (exponent <= 63, |x| <= 64e6) — products <= ~7e13"),
    "operators/SketchQueries.scala" -> (2,
      "HLL denominators 1e6*zcap (global + sliding-window reads): zcap is the capped register-sum <= registers*2^20 ~2.7e8 (model frame, corpus-independent)"),
    "operators/StarQueries2.scala" -> (9,
      "HLL zcap site (register-frame bound, as SketchQueries) plus closed-form-OLS continuations whose operands are DECIMAL/HUGEINT on the opening line"),
    "operators/TextAnalysis.scala" -> (11,
      "per-doc/per-pair token and shingle counts (doc-bounded <= ~1e8) plus KN-smoothing and dsir continuations HUGEINT/DECIMAL-routed on the opening line"),
    "functions/Exp2Micro.scala" -> (1,
      "JVM fixed-point internal: k = x DIV 1e6 with |x| <= 64e6 by the function's domain contract"),
    "functions/Log2Micro.scala" -> (1,
      "JVM fixed-point internal: exponent e <= 63, FracScale 2^20 — product <= ~7e13")
  )

  private def unroutedCount(text: String): Int =
    LintSource.stripComments(text).linesIterator.map { line =>
      val all = site.findAllIn(line).length
      if (all == 0 || routed.findFirstIn(line).isDefined) 0
      else math.max(0, all - litAdjacent.findAllIn(line).length)
    }.sum

  test("every un-routed micro cross-multiply is allowlisted with its bound") {
    val got = LintSource.mainSources().flatMap { case (rel, raw) =>
      val n = unroutedCount(raw)
      if (n > 0) Some(rel -> n) else None
    }
    allowed.foreach { case (f, (n, why)) =>
      assert(got.getOrElse(f, 0) == n,
        s"$f: allowlist says $n bounded micro-multiply site(s) [$why], " +
          s"found ${got.getOrElse(f, 0)} — a new x*10^6 site must either " +
          "route through DECIMAL(38,0)/HUGEINT or justify its bound here")
    }
    val unlisted = got.keySet -- allowed.keySet
    assert(unlisted.isEmpty,
      s"unlisted micro cross-multiply in ${unlisted.mkString(", ")} — " +
        "BIGINT x*10^6 wraps silently past ~9.2e12 while DuckDB raises; " +
        "route it through DECIMAL(38,0)/HUGEINT or record its bound in " +
        "MicroDomainLintSpec")
  }

  test("the matcher fires on planted sites and honors every auto-pass rule") {
    // negative control: a lint whose matcher silently rots would keep
    // green forever — prove each classification branch on synthetic
    // source
    assert(unroutedCount("""val x = expr("(n * 1000000) DIV d")""") == 1,
      "unrouted SQL-string site missed")
    assert(unroutedCount("val y = n * 1000000L - k") == 1,
      "unrouted Scala site missed")
    assert(unroutedCount(
      """val x = expr("CAST(n AS DECIMAL(38,0)) * 1000000 DIV d")""") == 0,
      "DECIMAL-routed line must auto-pass")
    assert(unroutedCount("""val s = "CAST(n AS HUGEINT) * 1000000"""") == 0,
      "HUGEINT-routed line must auto-pass")
    assert(unroutedCount("val binUs = 15L * 60 * 1000000") == 0,
      "literal*literal must auto-pass")
    assert(unroutedCount("// about n * 1000000 in prose") == 0,
      "comment must not count")
    assert(unroutedCount("val z = x * 1000000.0") == 0,
      "float quantization literal must not count")
  }

  test("no stale allowlist entries") {
    val files = LintSource.mainSources().keySet
    val stale = allowed.keys.filterNot(files.contains)
    assert(stale.isEmpty, s"stale entries: ${stale.mkString(", ")}")
  }
}
