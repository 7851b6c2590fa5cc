package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, expr}
import graft.functions.DotProduct
import graft.operators.Similarity

/** Interleaved A/B of the similarity hot loop: native codegen'd
  * `graft_dot` vs the interpreted `aggregate(zip_with(...))` HOF it
  * replaced. The tiny test tables are row-amplified (crossJoin with a
  * range) so ONE job scores millions of vectors — per-job fixed costs
  * would otherwise drown the per-row expression cost being measured.
  * Formulations alternate within each trial so host noise hits both
  * equally. Dev tool: `runMain graft.DotBench [sfDir] [amplify]`.
  */
object DotBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val amplify = args.lift(1).map(_.toInt).getOrElse(2000)
    val spark = SparkSession.builder()
      .master(s"local[${math.min(32, Runtime.getRuntime.availableProcessors())}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    DotProduct.register(spark)
    val q = Similarity.seededUnitVector(64, 1234L)
    val lit = q.map(x => s"${x}D").mkString("array(", ", ", ")")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .crossJoin(spark.range(amplify))
      .repartition(spark.sparkContext.defaultParallelism)
      .persist() // bench-owned: lives for the whole run, dies with the JVM
    val rows = emb.count()

    val native = s"graft_dot(embedding, $lit)"
    val hof = s"aggregate(zip_with(embedding, $lit, (x, y) -> cast(x as double) * y), 0D, (acc, v) -> acc + v)"

    def time(label: String, e: String): Double = {
      val t0 = System.nanoTime()
      emb.select(expr(e).as("d")).agg(expr("sum(d)")).head()
      val s = (System.nanoTime() - t0) / 1e9
      println(f"$label%-8s $s%8.2f s  ($rows rows)")
      s
    }
    // alternate within each trial; first pair is JIT warmup
    for (trial <- 1 to 3) {
      println(s"--- trial $trial")
      time("hof", hof)
      time("native", native)
    }
    spark.stop()
  }
}
