package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Recall sweep for the ANN paths against exact brute force, over TWO
  * corpora: recall@k of the IVF probe as a function of `nprobe` (over
  * a kMeans clustering of the corpus itself) and of multi-probe LSH as
  * a function of `probeFlips`, averaged over a set of seeded query
  * vectors. This turns the operators' "recall is governed by nprobe /
  * probe radius exactly as in published designs" claims into numbers
  * the docs can cite — the same measure-don't-guess role TopKBench and
  * SkewJoinBench play for the skew dispatch.
  *
  * The two corpora bracket the structure axis (round-11 verdict #4):
  *
  *  - `uniform`: the real `embeddings` table. The synthetic vectors
  *    are near-uniform on the sphere — no cluster structure for the
  *    coarse quantizer to exploit — so recall grows roughly in
  *    proportion to the scanned fraction: the structureless WORST
  *    case, still 3–6× better per scanned row than random sampling.
  *  - `clustered`: a deterministic mixture-of-Gaussians corpus
  *    ([[RecallBench.clusteredEmbeddings]]; 32 seeded unit centers,
  *    σ=0.15 per-axis noise, queries drawn from the same mixture) —
  *    the shape real text/image embeddings take, and the reason
  *    IVF/LSH indexes exist. Here the sweep shows the KNEE the
  *    uniform corpus cannot: most of a query's true top-k lives in
  *    very few probed cells.
  *
  * MEASURED (sf0.01: 500×64-dim uniform / 2000×64-dim clustered,
  * k=10, 10 queries, kMeans k=32, σ=0.15) — RECALL_r12.json:
  * uniform   IVF 0.10/0.20/0.41/0.61 at nprobe 1/2/4/8,
  *           LSH 0.10/0.37/0.75 at probeFlips 0/1/2;
  * clustered IVF 0.99/1.00/1.00/1.00 at nprobe 1/2/4/8,
  *           LSH 0.10/0.62/0.91 at probeFlips 0/1/2.
  * Two findings. (1) The IVF knee is exactly where the index's design
  * says it should be: on a clustered corpus nprobe=1 already recalls
  * 0.99 while scanning ~1/32 of the rows, and nprobe=2 is exhaustive
  * in effect — the basis for [[Similarity.ivfTopK]]'s small default
  * nprobe, with the uniform rows documenting the structureless worst
  * case (recall ≈ scanned fraction: raise nprobe toward the scan
  * budget, or skip the index). (2) LSH does NOT inherit the clustered
  * win: its hyperplanes are data-OBLIVIOUS, so mixture components
  * straddle the 16 sign-cells and flips-0 recall stays at 0.10 even
  * with structure present — consistent with the published contrast
  * between data-adaptive coarse quantizers (IVF) and random
  * projections. Prefer the IVF path when the corpus is clustered;
  * size probeFlips by this sweep when stuck with LSH.
  *
  * One JSON line on stdout, prefixed RECALL_JSON: (Locale-safe
  * formatting; see Slopes for why).
  */
object RecallBench {

  /** Deterministic mixture-of-Gaussians embedding corpus: row `id`
    * belongs to center `id % nCenters` (seeded unit vectors), with
    * per-axis N(0, noise²) jitter from a per-row seeded RNG — the
    * same rows regardless of partitioning or cluster size, so
    * measurements replay bit-for-bit. Unit-normalized FLOAT vectors,
    * (vec_id, embedding, label) like the driver's embeddings table. */
  def clusteredEmbeddings(spark: SparkSession, n: Long, dim: Int,
                          nCenters: Int, noise: Double,
                          seed: Long): DataFrame = {
    import spark.implicits._
    val centers = (0 until nCenters)
      .map(c => Similarity.seededUnitVector(dim, seed + c).toArray)
    spark.range(n).as[Long].map { id =>
      val v = mixtureVector(centers, id, noise, seed)
      (id, v, (id % nCenters).toInt)
    }.toDF("vec_id", "embedding", "label")
  }

  /** One mixture sample (shared by corpus rows and query vectors):
    * center (id % centers) + seeded per-row Gaussian jitter, unit
    * normalized. */
  private def mixtureVector(centers: IndexedSeq[Array[Double]], id: Long,
                            noise: Double, seed: Long): Array[Float] = {
    val c = centers((id % centers.size).toInt)
    // golden-ratio mix decorrelates consecutive ids' RNG streams
    val rnd = new java.util.Random(seed ^ (id * 0x9E3779B97F4A7C15L))
    val v = c.map(x => x + noise * rnd.nextGaussian())
    val norm = math.sqrt(v.map(x => x * x).sum).max(1e-12)
    v.map(x => (x / norm).toFloat)
  }

  def main(args: Array[String]): Unit = {
    val cpus = math.min(32, Runtime.getRuntime.availableProcessors())
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val k = sys.env.get("SPARK_GRAFT_RECALL_K").flatMap(_.toIntOption)
      .getOrElse(10)
    val nQueries = sys.env.get("SPARK_GRAFT_RECALL_QUERIES")
      .flatMap(_.toIntOption).getOrElse(10)
    val kmClusters = sys.env.get("SPARK_GRAFT_RECALL_CLUSTERS")
      .flatMap(_.toIntOption).getOrElse(32)
    val clusteredN = sys.env.get("SPARK_GRAFT_RECALL_CLUSTERED_N")
      .flatMap(_.toLongOption).getOrElse(2000L)
    val noise = 0.15
    val mixSeed = 42L

    /** recall@k curves for one corpus: IVF over nprobe, LSH over
      * probeFlips, truth = exact brute force per query. */
    def sweep(emb0: DataFrame, queries: Seq[Seq[Double]]):
        (Seq[(Int, Double)], Seq[(Int, Double)], Long) = {
      val emb = emb0.select("vec_id", "embedding")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val n = emb.count()
      // one clustering of the corpus, reused across every query/nprobe
      // — exactly how a standing IVF index would be built. The
      // assignment column is renamed: ivfTopK's probe join uses
      // "cluster" internally, and a caller-side column of that name
      // is ambiguous.
      val km = Similarity.kMeans(emb, "vec_id", "embedding",
        k = kmClusters, iters = 5, seed = 7L, keepCaches = true)
      val clustered = emb.join(
          km.assignments.withColumnRenamed("cluster", "km_cluster"), "vec_id")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      clustered.count()

      def ids(df: DataFrame): Set[Long] =
        df.select("vec_id").collect().map(_.getLong(0)).toSet
      val truth = queries.map(q =>
        ids(Similarity.bruteForceTopK(emb, "vec_id", "embedding", q, k)))
      def recall(results: Seq[Set[Long]]): Double =
        results.lazyZip(truth).map((r, t) => (r & t).size.toDouble / t.size)
          .sum / truth.size

      val ivf = Seq(1, 2, 4, 8).map { np =>
        np -> recall(queries.map(q => ids(Similarity.ivfTopK(
          clustered, "vec_id", "embedding", "km_cluster", q, k, nprobe = np))))
      }
      val lsh = Seq(0, 1, 2).map { pf =>
        pf -> recall(queries.map(q => ids(Similarity.lshTopK(
          emb, "vec_id", "embedding", q, k, numBits = 4, probeFlips = pf))))
      }
      spark.catalog.clearCache()
      (ivf, lsh, n)
    }

    def fmt(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.4f", Double.box(v))
    def curvesJson(ivf: Seq[(Int, Double)], lsh: Seq[(Int, Double)],
                   n: Long): String = {
      val i = ivf.map { case (np, r) => s""""nprobe_$np":${fmt(r)}""" }
        .mkString("{", ",", "}")
      val l = lsh.map { case (pf, r) => s""""flips_$pf":${fmt(r)}""" }
        .mkString("{", ",", "}")
      s"""{"n":$n,"ivf":$i,"lsh":$l}"""
    }

    // uniform = the real table, queried from off-corpus unit vectors
    // (unchanged from RECALL_r11 for cross-round comparability)
    val uniformQueries = (0 until nQueries).map(i =>
      Similarity.seededUnitVector(64, 1000L + i))
    val (uIvf, uLsh, uN) =
      sweep(Tables.embeddings(spark, dir), uniformQueries)

    // clustered = the mixture corpus, queried from the SAME mixture
    // (fresh ids past the corpus, so queries are near centers but not
    // corpus members — the serving shape)
    val centers = (0 until kmClusters)
      .map(c => Similarity.seededUnitVector(64, mixSeed + c).toArray)
    val clusteredQueries = (0 until nQueries).map(i =>
      mixtureVector(centers, clusteredN + i, noise, mixSeed)
        .map(_.toDouble).toSeq)
    val (cIvf, cLsh, cN) = sweep(
      clusteredEmbeddings(spark, clusteredN, 64, kmClusters, noise, mixSeed),
      clusteredQueries)

    println("RECALL_JSON:" +
      s"""{"k":$k,"queries":$nQueries,"clusters":$kmClusters,""" +
      s""""noise":${fmt(noise)},""" +
      s""""uniform":${curvesJson(uIvf, uLsh, uN)},""" +
      s""""clustered":${curvesJson(cIvf, cLsh, cN)}}""")
    spark.stop()
  }
}
