package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** SURVEY §7.3.5: the reference evaluates SELECT regexes with Go RE2
  * (data/sql-juice.go:49-57), Spark with Java regex (`rlike`). The
  * dialects agree on the documented grammar — literals (commas
  * included), `.*` wildcards, `|` alternation — and diverge only on
  * features RE2 rejects outright (backrefs, lookahead), which the
  * generated subset excludes BY CONSTRUCTION. This spec makes the
  * agreement claim executable instead of a comment
  * (sql/SelectParser.scala:13-17):
  *
  *  1. a hand-rolled evaluator implements the subset's semantics from
  *     the definition (unanchored search; alternation = exists-branch;
  *     branch = literal groups in order with arbitrary gaps at `.*`) —
  *     property-checked against java.util.regex on thousands of
  *     generated (pattern, line) samples;
  *  2. Spark's `rlike` is checked against the same evaluator on a
  *     seeded sample batch, evaluated in ONE job (non-foldable regexp
  *     column), so the distributed path is the thing tested.
  *
  * Since the evaluator is dialect-free (plain string search), both
  * dialects match it ⇒ they match each other on this subset.
  */
class SelectRegexPropertySpec extends AnyFunSuite {

  // ---- the RE2-safe subset -------------------------------------------
  sealed private trait Tok
  private case class Lit(s: String) extends Tok
  private case object Star extends Tok

  /** Pattern = alternation of branches; branch = literals and `.*`s. */
  private case class Pat(branches: List[List[Tok]]) {
    def render: String = branches.map(_.map {
      case Lit(s) => s
      case Star => ".*"
    }.mkString).mkString("|")
  }

  /** Branch → literal groups separated by wildcards (adjacent literals
    * concatenate; consecutive stars collapse — both are regex
    * identities). */
  private def groups(toks: List[Tok]): List[String] =
    toks.foldLeft(List("")) {
      case (acc, Lit(s)) => (acc.head + s) :: acc.tail
      case (acc, Star) => "" :: acc
    }.reverse

  /** Unanchored subset match: each literal group found in order, first
    * occurrence greedily — earliest placement maximizes room for later
    * groups, so existence is decided exactly. */
  private def handMatch(p: Pat, line: String): Boolean =
    p.branches.exists { b =>
      val gs = groups(b)
      var pos = 0
      var ok = true
      // all groups between wildcards must be found in order; the first
      // group is also unanchored because the whole search is
      for (g <- gs if ok) {
        val at = line.indexOf(g, pos)
        if (at < 0) ok = false else pos = at + g.length
      }
      ok
    }

  // ---- generators -----------------------------------------------------
  // alphabet includes ',' — the comma form is one of the three
  // documented shapes — and nothing regex-special
  private val alpha: Gen[Char] = Gen.oneOf(('a' to 'e') ++ ('0' to '2') :+ ',')
  private val genLit: Gen[Lit] =
    Gen.choose(1, 4).flatMap(n => Gen.listOfN(n, alpha)).map(cs => Lit(cs.mkString))
  private val genBranch: Gen[List[Tok]] = for {
    lits <- Gen.choose(1, 3).flatMap(n => Gen.listOfN(n, genLit))
    pre <- Gen.oneOf(true, false)
    seps <- Gen.listOfN(lits.size, Gen.oneOf(true, false))
  } yield {
    val body = lits.zip(seps).flatMap { case (l, s) =>
      if (s) List(Star, l) else List(l)
    }
    if (pre) Star :: body else body
  }
  private val genPat: Gen[Pat] =
    Gen.choose(1, 3).flatMap(n => Gen.listOfN(n, genBranch)).map(Pat(_))

  /** Lines are biased toward near-matches: fragments of the pattern's
    * own literals spliced between random filler, so the property
    * exercises both outcomes instead of trivially rejecting. */
  private def genLineFor(p: Pat): Gen[String] = {
    val lits = p.branches.flatten.collect { case Lit(s) => s }
    val frag = Gen.oneOf(
      Gen.choose(0, 4).flatMap(n => Gen.listOfN(n, alpha)).map(_.mkString),
      if (lits.nonEmpty) Gen.oneOf(lits) else Gen.const(""))
    Gen.choose(0, 4).flatMap(n => Gen.listOfN(n, frag)).map(_.mkString)
  }

  private val genCase: Gen[(Pat, String)] =
    for { p <- genPat; l <- genLineFor(p) } yield (p, l)

  // ---- 1. evaluator == java.util.regex, thousands of samples ---------
  test("subset evaluator agrees with java.util.regex find() on generated patterns") {
    val prop = Prop.forAll(genCase) { case (p, line) =>
      val jdk = java.util.regex.Pattern.compile(p.render).matcher(line).find()
      handMatch(p, line) == jdk
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(5000), prop)
    assert(res.passed, s"property failed: ${res.status}")
  }

  // ---- 2. Spark rlike == evaluator, one distributed job --------------
  test("Spark rlike agrees with the RE2-safe subset evaluator (seeded batch, one job)") {
    val spark = SparkSuite.spark
    import spark.implicits._
    val cases = Gen.listOfN(400, genCase)
      .pureApply(Gen.Parameters.default, Seed(42L))
      .map { case (p, line) => (p.render, line, handMatch(p, line)) }
    // sanity: the bias generator must produce a real mix of outcomes
    assert(cases.count(_._3) > 40, "too few matching samples to be meaningful")
    assert(cases.count(!_._3) > 40, "too few rejecting samples to be meaningful")
    val rows = cases.toDF("pat", "line", "expected")
      .withColumn("got", org.apache.spark.sql.functions.expr("line rlike pat"))
      .collect()
    rows.foreach { r =>
      assert(r.getAs[Boolean]("got") === r.getAs[Boolean]("expected"),
        s"dialect divergence on pattern='${r.getString(0)}' line='${r.getString(1)}'")
    }
  }
}
