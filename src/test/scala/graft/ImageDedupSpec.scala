package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col
import graft.operators.{Dedup, Multimodal}

/** Image perceptual-hash near-dup dedup ([[Multimodal.luminanceGrid]]
  * / [[Multimodal.dHash64FromGrid]] / [[Multimodal.imageNearDups]]):
  * exact grid arithmetic on constructed images, the dHash bit rule,
  * the sub-grid exclusion contract, banding == brute force on the
  * gate corpus, and planted near-dup recall/precision on generated
  * images — the multimodal twin of the text SimHash family's specs.
  */
class ImageDedupSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark

  /** Gray image: pixel (x, y) = v(x, y), encoded as a real PNG. */
  private def grayPng(w: Int, h: Int)(v: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val g = v(x, y) & 0xff
      img.setRGB(x, y, (g << 16) | (g << 8) | g)
    }
    Multimodal.encodePng(img)
  }

  test("luminanceGrid on an exactly grid-sized image is the pixels themselves") {
    // 9×8 image: every cell holds exactly one pixel, so the box mean
    // IS the pixel — pins the cell assignment with no averaging slack
    val png = grayPng(9, 8)((x, y) => (x * 7 + y * 11) % 256)
    val grid = Multimodal.luminanceGrid(png).get
    assert(grid.length === 72)
    for (y <- 0 until 8; x <- 0 until 9)
      assert(grid(y * 9 + x) === (x * 7 + y * 11) % 256,
        s"cell ($x,$y)")
  }

  test("luminanceGrid box mean is the FLOOR mean of each cell's pixels") {
    // 18×16: each cell = 2×2 pixels; make one cell's four pixels
    // average to a non-integer so the floor is observable
    val png = grayPng(18, 16) { (x, y) =>
      if (x < 2 && y < 2) Seq(10, 11, 12, 14)(y * 2 + x) // mean 11.75 → 11
      else 40
    }
    val grid = Multimodal.luminanceGrid(png).get
    assert(grid(0) === 11)
    assert(grid(1) === 40)
  }

  test("dHash64FromGrid sets bit cy*8+cx iff the right neighbor is strictly brighter") {
    // row 0 strictly increasing → bits 0..7 set; all other rows flat
    // (ties are NOT brighter) → bits 8..63 clear
    val grid = Array.tabulate(72) { i =>
      val cy = i / 9; val cx = i % 9
      if (cy == 0) cx * 10 else 100
    }
    assert(Multimodal.dHash64FromGrid(grid) === 0xffL)
    // bit 63 = row 7, comparison 7→8: exercises the sign bit
    val g63 = Array.tabulate(72) { i => if (i == 71) 200 else 50 }
    assert(Multimodal.dHash64FromGrid(g63) === Long.MinValue)
  }

  test("sub-grid, non-image, and null blobs yield no fingerprint") {
    assert(Multimodal.luminanceGrid(grayPng(8, 8)((_, _) => 5)).isEmpty)
    assert(Multimodal.luminanceGrid(grayPng(9, 7)((_, _) => 5)).isEmpty)
    assert(Multimodal.luminanceGrid("not an image".getBytes("UTF-8")).isEmpty)
    assert(Multimodal.luminanceGrid(null).isEmpty)
    assert(Multimodal.luminanceGrid(Array.emptyByteArray).isEmpty)
  }

  test("imageFingerprints == driver-side grid+dHash on the gate corpus") {
    val spark2 = spark
    import spark2.implicits._
    val pngs = Multimodal.asPngBlobTable(
      Tables.documents(spark, SparkSuite.sf0001), "doc_id", "text",
      width = 16)
    val got = Multimodal.imageFingerprints(pngs).collect()
      .map(r => r.getAs[Long]("id") ->
        (Option(r.getAs[scala.collection.Seq[Int]]("grid")).map(_.toList), Option(r.get(2)).map(_.asInstanceOf[Long])))
      .toMap
    val want = pngs.as[(Long, Array[Byte])].collect().map { case (id, d) =>
      val g = Multimodal.luminanceGrid(d)
      id -> (g.map(_.toSeq), g.map(Multimodal.dHash64FromGrid(_)))
    }.toMap
    assert(got.nonEmpty)
    assert(got === want)
    // both populations must be present for the null contract to bite
    assert(got.values.exists(_._2.isEmpty), "no sub-grid doc in corpus")
    assert(got.values.exists(_._2.nonEmpty), "no feasible doc in corpus")
  }

  test("imageNearDups == brute-force hamming pairs on the gate corpus (uncapped buckets)") {
    val pngs = Multimodal.asPngBlobTable(
      Tables.documents(spark, SparkSuite.sf0001), "doc_id", "text",
      width = 16)
    val fps = Multimodal.imageFingerprints(pngs)
      .filter(col("fp").isNotNull)
      .select("id", "fp").collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Long]("fp"))
    val brute = (for {
      (a, fa) <- fps; (b, fb) <- fps
      if a < b && java.lang.Long.bitCount(fa ^ fb) <= 3
    } yield (a, b, java.lang.Long.bitCount(fa ^ fb))).toSet
    val got = Multimodal.imageNearDups(pngs, maxHamming = 3,
        maxBucket = 1 << 20).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Int]("hamming"))).toSet
    assert(got === brute)
  }

  test("planted near-dup recall and precision on generated images") {
    val spark2 = spark
    import spark2.implicits._
    // 8 base families, cell-structured 36×32 gray images (each 9×8
    // cell = 4×4 pixels at a per-(family, cell) md5-derived level —
    // XOR/affine mixes proved degenerate here: adjacent-cell
    // comparisons were family-invariant, giving every family the
    // same dHash); near-dup twin: one cell shifted by +24 — an edit
    // an exact checksum flags as "different file" but a perceptual
    // hash must still pair (≤ 2 flipped comparisons)
    def cellValue(fam: Int, cx: Int, cy: Int): Int = {
      val md = java.security.MessageDigest.getInstance("MD5")
      md.digest(s"$fam|$cx|$cy".getBytes("UTF-8"))(0) & 0xff
    }
    def famPng(fam: Int, bump: Boolean): Array[Byte] =
      grayPng(36, 32) { (x, y) =>
        val cx = x / 4; val cy = y / 4
        val v = cellValue(fam, cx, cy)
        if (bump && cx == 4 && cy == 3) math.min(255, v + 24) else v
      }
    val rows = (0 until 8).flatMap { fam =>
      Seq((fam * 2L, famPng(fam, bump = false)),
          (fam * 2L + 1L, famPng(fam, bump = true)))
    }
    val blobs = rows.toDF("id", "data")
    val pairs = Multimodal.imageNearDups(blobs, maxHamming = 3,
        maxBucket = 64).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    val planted = (0 until 8).map(f => (f * 2L, f * 2L + 1L)).toSet
    assert(planted.subsetOf(pairs),
      s"missed planted pairs: ${(planted -- pairs).mkString(", ")}")
    assert(pairs === planted,
      s"false cross-family pairs: ${(pairs -- planted).mkString(", ")}")
    // and the twins are NOT byte-identical: exact dedup would miss them
    val byId = rows.toMap
    (0 until 8).foreach { f =>
      assert(!java.util.Arrays.equals(byId(f * 2L), byId(f * 2L + 1L)))
    }
  }

  test("imageNearDupsIncremental: batch × standing store finds exactly the cross-side pairs") {
    val spark2 = spark
    import spark2.implicits._
    def cellValue(fam: Int, cx: Int, cy: Int): Int = {
      val md = java.security.MessageDigest.getInstance("MD5")
      md.digest(s"$fam|$cx|$cy".getBytes("UTF-8"))(0) & 0xff
    }
    def famPng(fam: Int, bump: Boolean): Array[Byte] =
      grayPng(36, 32) { (x, y) =>
        val v = cellValue(fam, x / 4, y / 4)
        if (bump && x / 4 == 2 && y / 4 == 5) math.min(255, v + 24) else v
      }
    // corpus: 4 base families (even ids); batch: near-dup twins of
    // families 0 and 1 (odd ids) + one novel family with no partner
    val corpusBlobs = (0 until 4).map(f => (f * 2L, famPng(f, bump = false)))
      .toDF("id", "data")
    val corpusFps = Multimodal.imageFingerprints(corpusBlobs)
      .filter(col("fp").isNotNull).select(col("id"), col("fp"))
    val batch = Seq(
      (1L, famPng(0, bump = true)),
      (3L, famPng(1, bump = true)),
      (99L, famPng(7, bump = false))).toDF("id", "data")
    val got = Multimodal.imageNearDupsIncremental(batch, corpusFps)
      .collect()
      .map(r => (r.getAs[Long]("doc_new"), r.getAs[Long]("doc_corpus"))).toSet
    assert(got === Set((1L, 0L), (3L, 2L)))
    // twin check: the full self-join on batch ∪ corpus finds the same
    // cross pairs (and only adds within-side ones, absent here)
    val full = Multimodal.imageNearDups(batch.unionByName(corpusBlobs))
      .collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(full === Set((0L, 1L), (2L, 3L)))
  }

  test("hammingNearDups bucket cap only ever drops pairs (capped ⊆ uncapped)") {
    val spark2 = spark
    import spark2.implicits._
    // many ids sharing one chunk value: fps differing only in bits
    // 0..3 share chunks 1..3, so bucket sizes exceed a tiny cap
    val fps = (0L until 32L).map(i => (i, i % 16)).toDF("id", "fp")
    def pairs(cap: Int) = Dedup.hammingNearDups(fps, maxHamming = 3,
        maxBucket = cap).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    val capped = pairs(8)
    val uncapped = pairs(1 << 20)
    assert(capped.subsetOf(uncapped))
    assert(uncapped.nonEmpty)
  }
}
