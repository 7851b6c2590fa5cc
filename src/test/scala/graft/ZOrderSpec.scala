package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.ZOrder

/** [[ZOrder]] + [[graft.catalog.Catalog.putZOrdered]]: the Morton
  * arithmetic against a plain-Scala reference, the normalization
  * edges, and the property the layout exists for — every written
  * file covers a bounded range of BOTH dimensions (a single-column
  * sort gives tight ranges on one dimension and full-width on the
  * other, which is exactly what multi-dimensional file skipping
  * cannot use). */
class ZOrderSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark

  private def mortonRef(a: Long, b: Long, bits: Int): Long =
    (0 until bits).foldLeft(0L) { (acc, i) =>
      acc | ((a >> i) & 1L) << (2 * i) | ((b >> i) & 1L) << (2 * i + 1)
    }

  test("interleave matches the plain-Scala Morton reference") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(31337)
    val rows = Seq.fill(300)((rnd.nextInt(1 << 16).toLong, rnd.nextInt(1 << 16).toLong))
    val got = rows.toDF("a", "b")
      .select(col("a"), col("b"),
        ZOrder.interleave(col("a"), col("b"), 16).as("z"))
      .collect()
    got.foreach { r =>
      assert(r.getAs[Long]("z") ===
        mortonRef(r.getAs[Long]("a"), r.getAs[Long]("b"), 16))
    }
  }

  test("normalization: bounds map to [0, 2^bits); nulls and degenerate ranges to 0") {
    val s = spark
    import s.implicits._
    val df = Seq[(java.lang.Double, String)](
      (0.0, "lo"), (100.0, "hi"), (50.0, "mid"), (null, "null")
    ).toDF("v", "tag")
    val out = df.select(col("tag"),
        ZOrder.zValue(col("v"), lit(0.0), lit(100.0),
          lit(0.0), lit(0.0), lit(0.0), bits = 8).as("z"))
      .collect().map(r => r.getString(0) -> r.getAs[Long]("z")).toMap
    // second dimension is degenerate -> contributes 0 bits; z is the
    // spread of dimension a alone over even bit positions
    assert(out("lo") === 0L)
    assert(out("null") === 0L)
    assert(out("hi") === mortonRef(255L, 0L, 8))
    assert(out("mid") > out("lo") && out("mid") < out("hi"))
  }

  test("putZOrdered files tile BOTH dimensions (single-column sort cannot)") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(2024)
    val df = Seq.fill(20000)((rnd.nextDouble(), rnd.nextDouble())).toDF("x", "y")
    val dir = java.nio.file.Files.createTempDirectory("graft_zorder").toString
    val cat = new graft.catalog.Catalog(spark, dir)
    try {
      val entry = cat.putZOrdered("zlayout", df, "x", "y", numFiles = 16)
      val files = new java.io.File(entry.path).listFiles()
        .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
        .map(_.getAbsolutePath)
      assert(files.length >= 12, s"expected ~16 files, got ${files.length}")
      val ranges = files.map { f =>
        val r = spark.read.parquet(f)
          .agg(max(col("x")) - min(col("x")), max(col("y")) - min(col("y"))).first()
        (r.getDouble(0), r.getDouble(1))
      }
      // 16 z-tiles over uniform 2-D ≈ a 4×4 grid: the TYPICAL file
      // spans ~0.25 of each dimension. Equal-count cuts that straddle
      // a quadrant transition legitimately sweep one dimension (the
      // known z-curve boundary effect), so the pinned property is the
      // MEAN per-file range on BOTH dims — a sort by x alone scores
      // mean y-range ≈ 1.0 and can never pass the y bound.
      val meanX = ranges.map(_._1).sum / ranges.length
      val meanY = ranges.map(_._2).sum / ranges.length
      assert(meanX <= 0.5, s"mean per-file x-range $meanX — not tiled on x")
      assert(meanY <= 0.5, s"mean per-file y-range $meanY — not tiled on y")
      val tiled = ranges.count { case (rx, ry) => rx <= 0.55 && ry <= 0.55 }
      assert(tiled * 2 >= ranges.length,
        s"only $tiled/${ranges.length} files tile both dims")
      // file-skipping demo: a quarter-box predicate needs only the
      // files whose min/max intersect it — a strict subset
      val box = ranges.zip(files).count { case (_, f) =>
        val r = spark.read.parquet(f)
          .agg(min(col("x")), max(col("x")), min(col("y")), max(col("y"))).first()
        r.getDouble(0) <= 0.25 && r.getDouble(2) <= 0.25
      }
      assert(box < files.length,
        "every file intersects the quarter box — no skipping possible")
    } finally cat.close()
  }
}
