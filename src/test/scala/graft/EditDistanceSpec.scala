package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Dedup

/** Pins [[Dedup.editDistancePairs]] — the segment-blocked EXACT
  * edit-distance self-join — against plain-Scala brute force: the
  * blocking must be COMPLETE (every pair within maxDist found — the
  * property the q_fuzzy_join oracle relies on to verify with a
  * brute-force join instead of a blocking replay), distances exact,
  * no false positives, ids canonical, output deterministic. */
class EditDistanceSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark

  /** Textbook DP Levenshtein, the independent truth. */
  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  /** Seeded corpus: base strings over a small alphabet plus planted
    * mutants (substitution / deletion / insertion / double edits) so
    * every distance class and both length orientations appear. */
  private def corpus(n: Int, seed: Long): Seq[(Long, String)] = {
    val rnd = new scala.util.Random(seed)
    val alpha = "abcdef"
    def randStr(len: Int) =
      Seq.fill(len)(alpha(rnd.nextInt(alpha.length))).mkString
    val base = (0 until n).map(i => (i.toLong, randStr(6 + rnd.nextInt(12))))
    val mutants = base.filter(_._1 % 3 == 0).map { case (id, s) =>
      val p = rnd.nextInt(s.length)
      val m = rnd.nextInt(4) match {
        case 0 => s.updated(p, alpha(rnd.nextInt(alpha.length)))  // sub
        case 1 => s.patch(p, Nil, 1)                              // del
        case 2 => s.patch(p, Seq(alpha(rnd.nextInt(alpha.length))), 0) // ins
        case _ => s.patch(p, Nil, 1).updated(0, 'f')              // del+sub
      }
      (id + 10000L, m)
    }
    base ++ mutants
  }

  private def truth(rows: Seq[(Long, String)], k: Int): Set[(Long, Long, Int)] =
    (for {
      (ia, sa) <- rows; (ib, sb) <- rows if ia < ib
      d = lev(sa, sb) if d <= k
    } yield (ia, ib, d)).toSet

  test("blocked join equals brute force: complete, exact, canonical (k = 1, 2, 3, 5)") {
    import spark.implicits._
    // k = 5 exercises the degenerate regime where many strings are
    // barely longer than the k+1 segments (segment length 1-3 chars,
    // fat buckets) — the blocking must stay complete, just less
    // selective
    val rows = corpus(120, seed = 7L)
    val df = rows.toDF("id", "s")
    for (k <- Seq(1, 2, 3, 5)) {
      val got = Dedup.editDistancePairs(df, "id", "s", maxDist = k)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      val want = truth(rows, k)
      val missing = want -- got
      val extra = got -- want
      assert(missing.isEmpty, s"k=$k blocking lost pairs: $missing")
      assert(extra.isEmpty, s"k=$k false positives: $extra")
      assert(got.forall { case (a, b, d) => a < b && d >= 0 && d <= k })
    }
  }

  test("edge cases: empty and tiny strings, exact dups, determinism under repartition") {
    import spark.implicits._
    val rows: Seq[(Long, String)] = Seq(
      (1L, ""), (2L, "a"), (3L, "b"), (4L, "ab"), (5L, "ab"),
      (6L, "abc"), (7L, "xyz"), (8L, "abcd"))
    val df = rows.toDF("id", "s")
    val got = Dedup.editDistancePairs(df, "id", "s", maxDist = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got === truth(rows, 2),
      "tiny/empty strings must pair through the short-segment buckets")
    // exact duplicates appear with dist 0
    assert(got.contains((4L, 5L, 0)))
    // null strings drop rather than NPE
    val withNull = rows.toDF("id", "s")
      .unionByName(Seq((9L, null.asInstanceOf[String])).toDF("id", "s"))
    assert(Dedup.editDistancePairs(withNull, "id", "s", maxDist = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      === got)
    // deterministic under repartition
    val a = Dedup.editDistancePairs(df.repartition(7), "id", "s", 2)
      .collect().map(_.toString).sorted
    val b = Dedup.editDistancePairs(df.repartition(3), "id", "s", 2)
      .collect().map(_.toString).sorted
    assert(a === b)
    intercept[IllegalArgumentException](
      Dedup.editDistancePairs(df, "id", "s", maxDist = 0))
  }

  test("A-cross-B join equals cross brute force; within-corpus pairs never emitted") {
    import spark.implicits._
    val rows = corpus(100, seed = 11L)
    // split into two corpora with OVERLAPPING ids (ids are only
    // per-corpus keys in record linkage)
    val a = rows.filter(_._1 % 2 == 0)
    val b = rows.filter(_._1 % 2 == 1).map { case (id, s) => (id - 1, s) }
    for (k <- Seq(1, 2)) {
      val got = Dedup.editDistanceJoinAB(
          a.toDF("id", "s"), "id", "s", b.toDF("id", "s"), "id", "s",
          maxDist = k)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      val want = (for {
        (ia, sa) <- a; (ib, sb) <- b
        d = lev(sa, sb) if d <= k
      } yield (ia, ib, d)).toSet
      assert((want -- got).isEmpty, s"k=$k AB blocking lost pairs: ${want -- got}")
      assert((got -- want).isEmpty, s"k=$k AB false positives: ${got -- want}")
    }
    // a corpus joined against itself emits the full id×id square
    // (minus nothing — same id on DIFFERENT sides is a legal link),
    // never the within-corpus pairs: identical strings under two ids
    // in A alone must not appear
    val aa = Dedup.editDistanceJoinAB(
        a.toDF("id", "s"), "id", "s",
        Seq((999L, "zzzzzzzz")).toDF("id", "s"), "id", "s", maxDist = 2)
      .collect()
    assert(aa.forall(_.getLong(1) == 999L),
      "only cross-side pairs may be emitted")
  }
}
