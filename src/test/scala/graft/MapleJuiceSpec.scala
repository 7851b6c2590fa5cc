package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{HashPartition, MapleJuice, PartitionMode, RangePartition}

class MapleJuiceSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark

  test("groupRuns groups a sorted iterator into per-key runs") {
    val in = Iterator(("a", "1"), ("a", "2"), ("b", "3"), ("c", "4"), ("c", "5"))
    val out = MapleJuice.groupRuns(in)
      .map { case (k, vs) => k -> vs.toList }.toList
    assert(out === List("a" -> List("1", "2"), "b" -> List("3"),
                        "c" -> List("4", "5")))
  }

  test("maple emits key/value pairs from lines") {
    import spark.implicits._
    val lines = Seq("x,1", "y,2", "x,3").toDS()
    val kv = MapleJuice.maple(lines, 2) { l =>
      val Array(k, v) = l.split(","); Iterator((k, v))
    }
    assert(kv.collect().toSet === Set(("x", "1"), ("y", "2"), ("x", "3")))
  }

  test("property: juice grouped results identical under hash vs range partitioning") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val keys = Vector("a", "b", "c", "dd", "éz", "", " ", "z9")
    for (trial <- 1 to 5) {
      val pairs = Vector.fill(rnd.nextInt(200) + 1)(
        (keys(rnd.nextInt(keys.size)), rnd.nextInt(1000).toString))
      val kv = pairs.toDS()
      def run(mode: PartitionMode) =
        MapleJuice.juice(kv, trial, mode) { (k, vs) =>
          Iterator((k, vs.toList.sorted.mkString("|")))
        }.collect().toSet
      assert(run(HashPartition) === run(RangePartition), s"trial $trial")
      // group totals also match a plain groupBy (partitioning-invariant)
      val viaJuice = run(HashPartition).map { case (k, joined) =>
        k -> joined.split("\\|", -1).length
      }.toMap
      val expected = pairs.groupBy(_._1).map { case (k, vs) => k -> vs.size }
      assert(viaJuice === expected, s"trial $trial group sizes")
    }
  }

  test("range partitioning keeps keys lexicographically contiguous per partition") {
    import spark.implicits._
    val kv = (1 to 500).map(i => (f"k${i % 37}%03d", i.toString)).toDS()
    val parts = kv.repartitionByRange(4, org.apache.spark.sql.functions.col("_1"))
      .mapPartitions(it => Iterator(it.map(_._1).toSet))
      .collect().filter(_.nonEmpty)
    // partitions hold disjoint key sets whose [min,max] string ranges don't overlap
    val ranges = parts.map(s => (s.min, s.max)).sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo2, _)) => assert(hi <= lo2)
      case _ =>
    }
  }

  test("juice respects numTasks as the reduce-side partition count") {
    import spark.implicits._
    val kv = (1 to 100).map(i => (s"k${i % 10}", "v")).toDS()
    val n = MapleJuice.juice(kv, 3, HashPartition) { (k, vs) =>
      Iterator((k, vs.size))
    }.rdd.getNumPartitions
    assert(n === 3)
  }
}
