package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation by key salting. AQE's skew-join handling covers
  * sort-merge joins at runtime; explicit salting remains the tool for
  * broadcast-ineligible skewed joins and for pre-aggregation when one
  * hot key would otherwise land on a single reducer.
  */
object Skew {

  /** Join `big` (skewed) with `small` on `key`, spreading each hot key
    * over `saltFactor` partitions: the big side gets a per-row salt,
    * the small side is replicated once per salt value. Result is
    * row-identical to the unsalted join; only the key distribution of
    * the exchange changes.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 saltFactor: Int): DataFrame = {
    require(saltFactor >= 1)
    val salts = array((0 until saltFactor).map(lit): _*)
    val bigS = big.withColumn("__salt",
      pmod(xxhash64(col(key), monotonically_increasing_id()), lit(saltFactor))
        .cast("int"))
    val smallS = small.withColumn("__salt", explode(salts))
    bigS.join(smallS, Seq(key, "__salt")).drop("__salt")
  }

  /** Two-phase count for a skewed grouping key: count per (key, salt)
    * first (spreads the hot key), then sum per key. Spark's partial
    * aggregation already does this for simple counts; the explicit
    * form is for aggregates whose partial form is expensive (e.g.
    * collect-style) or when the first-phase output feeds further
    * per-salt processing. */
  def saltedGroupCount(df: DataFrame, key: String, saltFactor: Int): DataFrame =
    df.withColumn("__salt",
        pmod(xxhash64(col(key), monotonically_increasing_id()), lit(saltFactor)))
      .groupBy(col(key), col("__salt")).agg(count(lit(1)).as("__partial"))
      .groupBy(col(key)).agg(sum(col("__partial")).as("cnt"))
}
