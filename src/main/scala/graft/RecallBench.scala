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
  * k=10, 10 queries, kMeans k=32, σ=0.15) — RECALL.json, history in
  * bench_archive/RECALL_HISTORY.jsonl (IVF/LSH rows unchanged since
  * the r12 entry):
  * uniform   IVF 0.10/0.20/0.41/0.61 at nprobe 1/2/4/8,
  *           LSH 0.10/0.37/0.75 at probeFlips 0/1/2;
  * clustered IVF 0.99/1.00/1.00/1.00 at nprobe 1/2/4/8,
  *           LSH 0.10/0.62/0.91 at probeFlips 0/1/2.
  *
  * PQ paths (new in r17). Clustered: plain PQ ADC saturates at its
  * QUANTIZATION ceiling — 0.38 (m=8) / 0.49 (m=16) full-scan, and
  * IVF+PQ hits the same ceiling from nprobe=1 (the coarse probe is
  * near-perfect; resolution, not routing, is the bottleneck). The
  * float RERANK stage closes it: a 4×k ADC shortlist rescored with
  * exact dots reaches 0.95/0.92, an 8×k shortlist 0.99–1.00 —
  * matching the exact-float stored-IVF row at nprobe ≥ 2 (m=16·sf8:
  * 1.00 at nprobe 2/4/8) while the scan stays PQ-cheap: the rescore
  * reads only shortlist rows from the probed partitions. Uniform:
  * rerank ≈ min(IVF routing recall, shortlist survival) — 0.61 ceiling
  * at nprobe=8, exactly the scanned-fraction bound, confirming the
  * structureless corpus gains nothing from finer ADC. Quantized LSH
  * (int8 + bucket store) tracks float LSH to the 4th decimal at every
  * flip count on BOTH corpora — int8 costs no measurable recall.
  * Sizing guidance: probe by the [[Similarity.ivfPqTopK]] L2 proxy,
  * shortlistFactor 4 for throughput, 8 when recall must match
  * exact-float serving.
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
  * RECALL AFTER NO-REFIT APPEND (round-18, re-measured round-19 with
  * FROZEN base-fit probe routing — [[Similarity.ivfTopKStored]], the
  * true no-refit serving path; the earlier member-mean routing let
  * appended rows partially update the quantizer and overstated
  * high-nprobe recovery): the q_ann_ivf_append maintenance path's
  * "refit offline when recall decays" trade, measured at 50% and 100%
  * store growth — base-fit centroids AND base-fit PQ codebooks,
  * appended rows assigned map-side. The verdict is about
  * DISTRIBUTION, not volume. In-distribution growth is free: the
  * 50%-growth config's base (ids ≢ 2 mod 3) still samples every
  * mixture component, and clustered IVF recall stays 1.00 at every
  * nprobe (uniform: 0.61 → 0.53 at nprobe 8, within the
  * structureless noise). Out-of-distribution growth is catastrophic:
  * the 100%-growth config's base (even ids) contains only the 16
  * EVEN mixture components, so the append introduces 16 unseen
  * modes — clustered IVF craters 0.99 → 0.27 at nprobe 1, recovering
  * only to 0.82 at nprobe 8 (appended odd-mode vectors crowd into
  * whatever base cell is nearest, and probing can't recover
  * resolution the quantizer never had). Base-fit PQ codebooks show
  * the same split (m=16 clustered: 0.51 ceiling under
  * in-distribution growth vs 0.45-at-nprobe-8 with new modes).
  * Operational rule this buys: monitor the appended slice for NEW
  * cluster structure (e.g. assignment-distance drift), not for
  * volume — refit when modes appear, not at a growth percentage.
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

    /** recall@k curves for one corpus — IVF over nprobe, LSH over
      * probeFlips, PQ over m, IVF+PQ over the nprobe × m grid,
      * quantized-LSH over probeFlips — truth = exact brute force per
      * query (dot ranking; identical to L2 ranking on these
      * unit-normalized corpora, so the PQ paths' L2 ADC is measured
      * against the same truth). */
    def sweep(emb0: DataFrame, queries: Seq[Seq[Double]]):
        (Seq[(Int, Double)], Seq[(Int, Double)], Seq[(Int, Double)],
          Seq[((Int, Int), Double)], Seq[((Int, Int), Double)],
          Seq[(Int, Double)], Long) = {
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

      // PQ paths (round-17: the r12 artifact predates pqTopK/ivfPqTopK
      // and the quantized store). Codebooks are fit once per
      // (corpus, m) and the codes frame joined to the SAME standing
      // clustering as the IVF rows — exactly the serving layout the
      // q_ann_ivfpq store holds. m=8 → 8-dim subspaces (32× code
      // compression at 64-dim), m=16 → 4-dim (finer ADC resolution).
      val pqGrid = Seq(8, 16)
      val pqModels = pqGrid.map(m => m -> Similarity.pqFit(
        emb, "vec_id", "embedding", m = m, k = 16, iters = 5, seed = 7L))
      val pqCurves = pqModels.map { case (m, model) =>
        val codes = Similarity.pqEncode(emb, "vec_id", "embedding", model)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        codes.count()
        val r = recall(queries.map(q =>
          ids(Similarity.pqTopK(codes, "vec_id", q, model, k))))
        codes.unpersist()
        m -> r
      }
      // floats with the cluster column: the rerank's rescore read is
      // pruned to the probed cells, exactly the serving layout
      val floatsByCluster = emb.join(km.assignments, "vec_id")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      floatsByCluster.count()
      val pqPairs = pqModels.map { case (m, model) =>
        val stored = Similarity.pqEncode(emb, "vec_id", "embedding", model)
          .join(km.assignments, "vec_id")
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        stored.count()
        val adc = Seq(1, 2, 4, 8).map { np =>
          (m, np) -> recall(queries.map(q => ids(Similarity.ivfPqTopK(
            stored, "vec_id", km.centroids, model, q, k, nprobe = np))))
        }
        // + the float rerank of an sf×k ADC shortlist — the serving
        // pipeline's final stage; measures how much of the PQ
        // quantization ceiling the rescore recovers, and how the
        // residual (true neighbors dropped from the shortlist by ADC
        // ordering error) shrinks as the shortlist grows
        val rr = for {
          sf <- Seq(4, 8)
          np <- Seq(1, 2, 4, 8)
        } yield (m * 100 + sf, np) -> recall(queries.map(q =>
          ids(Similarity.ivfPqTopKReranked(stored, floatsByCluster,
            "vec_id", "embedding", km.centroids, model, q, k,
            nprobe = np, shortlistFactor = sf))))
        stored.unpersist()
        (adc, rr)
      }
      floatsByCluster.unpersist()
      val ivfPqCurves = pqPairs.flatMap(_._1)
      val rerankCurves = pqPairs.flatMap(_._2)
      // the full production LSH layout: sign-bucketed + int8-quantized
      val lshStored = Similarity.quantizeInt8(
          Similarity.withLshBucket(emb, "embedding", 64, numBits = 4,
            seed = 7L),
          "vec_id", "embedding")
        .select("vec_id", "scale", "qvec", "bucket")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      lshStored.count()
      val lshqCurves = Seq(0, 1, 2).map { pf =>
        pf -> recall(queries.map(q => ids(Similarity.lshTopKQuantized(
          lshStored, "vec_id", q, k, numBits = 4, probeFlips = pf))))
      }
      spark.catalog.clearCache()
      (ivf, lsh, pqCurves, ivfPqCurves, rerankCurves, lshqCurves, n)
    }

    def fmt(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.4f", Double.box(v))
    /** Recall after a NO-REFIT append (round-17 verdict #3): fit the
      * coarse quantizer (and PQ codebooks) on a BASE slice only, give
      * the appended slice its cluster via [[Similarity
      * .assignedToCentroids]] (the q_ann_ivf_append maintenance path,
      * no refit), and measure recall@k of the combined store against
      * brute-force truth over the FULL corpus — the number that tells
      * an operator when "refit offline when recall decays" actually
      * bites. `mod`/`keep` pick the base fraction: (3,2) = appended
      * rows are 50% of the base (50% growth), (2,1) = 100% growth. */
    def appendSweep(emb0: DataFrame, queries: Seq[Seq[Double]],
                    mod: Int, keep: Int):
        (Seq[(Int, Double)], Seq[((Int, Int), Double)]) = {
      val emb = emb0.select("vec_id", "embedding")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      emb.count()
      def ids(df: DataFrame): Set[Long] =
        df.select("vec_id").collect().map(_.getLong(0)).toSet
      val truth = queries.map(q =>
        ids(Similarity.bruteForceTopK(emb, "vec_id", "embedding", q, k)))
      def recall(results: Seq[Set[Long]]): Double =
        results.lazyZip(truth).map((r, t) => (r & t).size.toDouble / t.size)
          .sum / truth.size
      val base = emb.filter(col("vec_id") % mod < keep)
      val appended = emb.filter(col("vec_id") % mod >= keep)
      val km = Similarity.kMeans(base, "vec_id", "embedding",
        k = kmClusters, iters = 5, seed = 7L, keepCaches = true)
      // base rows keep their fit-time assignment; appended rows get
      // the map-side no-refit assignment — exactly the store
      // q_ann_ivf_append maintains
      val assignedAll = base.join(km.assignments, "vec_id")
        .unionByName(
          Similarity.assignedToCentroids(appended, "embedding", km.centroids))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      assignedAll.count()
      // probe routing uses the FROZEN base-fit centroids (ivfTopKStored
      // — the production no-refit path), not per-cell member means:
      // ivfTopK re-derives each cell's routing centroid from its
      // current members, which would let the appended rows partially
      // update the quantizer this sweep holds fixed (round-18 ADVICE)
      val ivf = Seq(1, 2, 4, 8).map { np =>
        np -> recall(queries.map(q => ids(Similarity.ivfTopKStored(
          assignedAll, "vec_id", "embedding", "cluster", km.centroids,
          q, k, nprobe = np))))
      }
      // the PQ codebooks are ALSO base-fit (no re-encode of the store
      // on append), so this measures coarse-routing drift and codebook
      // drift together — the full production exposure
      val ivfPq = Seq(8, 16).flatMap { m =>
        val model = Similarity.pqFit(base, "vec_id", "embedding",
          m = m, k = 16, iters = 5, seed = 7L)
        val stored = Similarity.pqEncode(emb, "vec_id", "embedding", model)
          .join(assignedAll.select("vec_id", "cluster"), "vec_id")
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        stored.count()
        val curve = Seq(1, 2, 4, 8).map { np =>
          (m, np) -> recall(queries.map(q => ids(Similarity.ivfPqTopK(
            stored, "vec_id", km.centroids, model, q, k, nprobe = np))))
        }
        stored.unpersist()
        curve
      }
      assignedAll.unpersist()
      spark.catalog.clearCache()
      (ivf, ivfPq)
    }

    def appendJson(ivf: Seq[(Int, Double)],
                   ivfpq: Seq[((Int, Int), Double)]): String = {
      val i = ivf.map { case (np, r) => s""""nprobe_$np":${fmt(r)}""" }
        .mkString("{", ",", "}")
      val ip = ivfpq.map { case ((m, np), r) =>
        s""""m${m}_nprobe_$np":${fmt(r)}""" }.mkString("{", ",", "}")
      s"""{"ivf":$i,"ivfpq":$ip}"""
    }


    def curvesJson(ivf: Seq[(Int, Double)], lsh: Seq[(Int, Double)],
                   pq: Seq[(Int, Double)], ivfpq: Seq[((Int, Int), Double)],
                   rerank: Seq[((Int, Int), Double)],
                   lshq: Seq[(Int, Double)], n: Long): String = {
      val i = ivf.map { case (np, r) => s""""nprobe_$np":${fmt(r)}""" }
        .mkString("{", ",", "}")
      val l = lsh.map { case (pf, r) => s""""flips_$pf":${fmt(r)}""" }
        .mkString("{", ",", "}")
      val p = pq.map { case (m, r) => s""""m_$m":${fmt(r)}""" }
        .mkString("{", ",", "}")
      val ip = ivfpq.map { case ((m, np), r) =>
        s""""m${m}_nprobe_$np":${fmt(r)}""" }.mkString("{", ",", "}")
      // rerank key carries the shortlist factor: m·100+sf encodes
      // (m, shortlistFactor) — rendered as m{m}_sf{factor}_nprobe_{np}
      val rr = rerank.map { case ((msf, np), r) =>
        s""""m${msf / 100}_sf${msf % 100}_nprobe_$np":${fmt(r)}""" }
        .mkString("{", ",", "}")
      val lq = lshq.map { case (pf, r) => s""""flips_$pf":${fmt(r)}""" }
        .mkString("{", ",", "}")
      s"""{"n":$n,"ivf":$i,"lsh":$l,"pq":$p,"ivfpq":$ip,""" +
        s""""ivfpq_rerank":$rr,"lsh_quantized":$lq}"""
    }

    // uniform = the real table, queried from off-corpus unit vectors
    // (unchanged from RECALL_r11 for cross-round comparability)
    val uniformQueries = (0 until nQueries).map(i =>
      Similarity.seededUnitVector(64, 1000L + i))
    val (uIvf, uLsh, uPq, uIvfPq, uRr, uLshQ, uN) =
      sweep(Tables.embeddings(spark, dir), uniformQueries)

    // clustered = the mixture corpus, queried from the SAME mixture
    // (fresh ids past the corpus, so queries are near centers but not
    // corpus members — the serving shape)
    val centers = (0 until kmClusters)
      .map(c => Similarity.seededUnitVector(64, mixSeed + c).toArray)
    val clusteredQueries = (0 until nQueries).map(i =>
      mixtureVector(centers, clusteredN + i, noise, mixSeed)
        .map(_.toDouble).toSeq)
    val (cIvf, cLsh, cPq, cIvfPq, cRr, cLshQ, cN) = sweep(
      clusteredEmbeddings(spark, clusteredN, 64, kmClusters, noise, mixSeed),
      clusteredQueries)

    // recall after no-refit append at 50% / 100% store growth
    val uA50 = appendSweep(Tables.embeddings(spark, dir), uniformQueries, 3, 2)
    val uA100 = appendSweep(Tables.embeddings(spark, dir), uniformQueries, 2, 1)
    val cCorpus = clusteredEmbeddings(spark, clusteredN, 64, kmClusters,
      noise, mixSeed)
    val cA50 = appendSweep(cCorpus, clusteredQueries, 3, 2)
    val cA100 = appendSweep(cCorpus, clusteredQueries, 2, 1)

    val line =
      s"""{"k":$k,"queries":$nQueries,"clusters":$kmClusters,""" +
      s""""noise":${fmt(noise)},""" +
      s""""uniform":${curvesJson(uIvf, uLsh, uPq, uIvfPq, uRr, uLshQ, uN)},""" +
      s""""clustered":${
        curvesJson(cIvf, cLsh, cPq, cIvfPq, cRr, cLshQ, cN)},""" +
      s""""uniform_append":{"growth_50":${appendJson(uA50._1, uA50._2)},""" +
      s""""growth_100":${appendJson(uA100._1, uA100._2)}},""" +
      s""""clustered_append":{"growth_50":${appendJson(cA50._1, cA50._2)},""" +
      s""""growth_100":${appendJson(cA100._1, cA100._2)}}}"""
    println("RECALL_JSON:" + line)
    // ONE current artifact (RECALL.json) + an append-only history,
    // the BENCH_FULL/BENCH_HISTORY discipline (round-17 verdict #8:
    // per-round RECALL_r{n}.json files were accumulating)
    val outFile = sys.env.getOrElse("SPARK_GRAFT_RECALL_OUT", "RECALL.json")
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get(outFile), line + "\n")
    catch { case e: Throwable =>
      System.err.println(s"[recall] could not write $outFile: ${e.getMessage}")
    }
    try {
      val cwd = java.nio.file.Paths.get("").toAbsolutePath
      val repoRoot = Iterator.iterate(cwd)(_.getParent).takeWhile(_ != null)
        .find(p => java.nio.file.Files.exists(p.resolve("build.sbt")))
        .getOrElse(cwd)
      val hist = repoRoot.resolve("bench_archive/RECALL_HISTORY.jsonl")
      java.nio.file.Files.createDirectories(hist.getParent)
      java.nio.file.Files.writeString(hist,
        s"""{"at":"${java.time.Instant.now()}","recall":$line}""" + "\n",
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.APPEND)
    } catch { case e: Throwable =>
      System.err.println(s"[recall] could not append history: ${e.getMessage}")
    }
    spark.stop()
  }
}
