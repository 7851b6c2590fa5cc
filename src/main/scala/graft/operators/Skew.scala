package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Exact top-k per group without a per-group global sort. A plain
    * `row_number().over(partitionBy(group))` sends EVERY row of a
    * group to one task — with a low-cardinality group column (e.g. 3
    * return flags) that is a whole-table sort in 3 tasks, the
    * canonical window-skew killer at 100 TB. Phase 1 ranks within
    * (group, salt) — saltFactor× the parallelism, each task sorting
    * ~1/saltFactor of a group — and keeps k rows per salted bucket;
    * the true global top-k all survive, because any row globally
    * above one of them inside its bucket is also globally above it.
    * Phase 2 re-ranks the ≤ k·saltFactor survivors per group — a
    * trivially small window. Output rows and ranks equal the
    * single-window form PROVIDED `orderCols` is a total order
    * (include tiebreaker columns); ties at the cut make both forms
    * nondeterministic. `rankCol` carries the final 1..k rank. */
  def saltedTopK(df: DataFrame, groupCols: Seq[String],
                 orderCols: Seq[Column], k: Int,
                 saltFactor: Int = 64, rankCol: String = "rn"): DataFrame = {
    require(k >= 1 && saltFactor >= 1)
    require(!df.columns.contains("__salt"),
      "saltedTopK: input already has a __salt column")
    require(!df.columns.contains(rankCol),
      s"saltedTopK: input already has a '$rankCol' column — pass a free rankCol")
    val gcols = groupCols.map(col)
    val w1 = org.apache.spark.sql.expressions.Window
      .partitionBy(gcols :+ col("__salt"): _*).orderBy(orderCols: _*)
    val w2 = org.apache.spark.sql.expressions.Window
      .partitionBy(gcols: _*).orderBy(orderCols: _*)
    // the salt is a DETERMINISTIC function of the full row (hash of
    // every column), never monotonically_increasing_id(): a
    // nondeterministic shuffle key re-salts rows on stage retry, and
    // a true top-k row recomputed into a different bucket than the
    // one already fetched is silently lost. Full-row duplicates
    // sharing a bucket is harmless — they are interchangeable under
    // the total order.
    df.withColumn("__salt",
        pmod(xxhash64(df.columns.map(col).toIndexedSeq: _*), lit(saltFactor))
          .cast("int"))
      .withColumn(rankCol, row_number().over(w1))
      .filter(col(rankCol) <= k)
      .drop("__salt")
      .withColumn(rankCol, row_number().over(w2))
      .filter(col(rankCol) <= k)
  }
}
