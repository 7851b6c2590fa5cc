package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** As-of (most-recent-match) join: for every left row (key, ts),
  * attach the latest right row with the same key and right.ts ≤
  * left.ts, or NULLs when none exists.
  *
  * Spark has no native as-of join; per the extension preference order
  * this composes existing operators (option (a)) instead of a custom
  * SparkPlan: tag + union both sides, one window over (key, ts) with
  * a last-non-null carry-forward, keep the left rows. Exactly one
  * shuffle (the window's partition on key) regardless of input sizes
  * — same exchange a sort-merge join would need, no range explosion.
  * Right rows sort before left rows at equal ts, giving the
  * conventional inclusive (≤) semantics.
  */
object AsOfJoin {

  /** @param left      rows to enrich
    * @param right     reference rows to look up as-of
    * @param keyCol    equi-key on both sides
    * @param leftTs    left ordering column (numeric or timestamp)
    * @param rightTs   right ordering column (same type)
    * @param rightVals right columns to attach (emitted as
    *                  `asof_<name>`, plus `asof_ts` for rightTs)
    */
  def asOf(left: DataFrame, right: DataFrame, keyCol: String,
           leftTs: String, rightTs: String,
           rightVals: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val l = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
      .withColumn("__rts", lit(null).cast(right.schema(rightTs).dataType))
      .select((Seq(col(keyCol).as("__key"), col("__ts"), col("__side"), col("__rts")) ++
        leftCols.map(col) ++
        rightVals.map(c => lit(null).cast(right.schema(c).dataType).as(s"__v_$c"))): _*)
    val r = right
      .withColumn("__ts", col(rightTs))
      .withColumn("__side", lit(0))
      .withColumn("__rts", col(rightTs))
      .select((Seq(col(keyCol).as("__key"), col("__ts"), col("__side"), col("__rts")) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        rightVals.map(c => col(c).as(s"__v_$c"))): _*)

    val w = Window.partitionBy(col("__key"))
      .orderBy(col("__ts").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val filled = l.unionByName(r)
      .withColumn("asof_ts", last(col("__rts"), ignoreNulls = true).over(w))
    val withVals = rightVals.foldLeft(filled) { (df, c) =>
      df.withColumn(s"asof_$c", last(col(s"__v_$c"), ignoreNulls = true).over(w))
    }
    withVals.filter(col("__side") === 1)
      .select((leftCols.map(col) :+ col("asof_ts")) ++
        rightVals.map(c => col(s"asof_$c")): _*)
  }
}
