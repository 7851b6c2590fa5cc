// Dev scratch: print physical plans of the round's new queries at a
// given SF dir. Run: sbt 'runMain graft.tools.PlanAudit /root/testdata/sf0.1'
package graft.tools

import org.apache.spark.sql.SparkSession

object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    for (q <- Seq("q_lm_perplexity", "q_dsir_sample", "q_pack_whole",
        "q_bpe_roundtrip")) {
      println(s"===== $q =====")
      graft.SparkEntry.queries(q)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
