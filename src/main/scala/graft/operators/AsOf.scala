package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join: for each left row, attach the latest right row with
  * `right.ts <= left.ts` within the same partition keys.
  *
  * Spark has no native ASOF JOIN (DuckDB does; the oracle uses it). A naive
  * range join is O(n·m) per key; instead we union both sides and take a
  * running `max(struct(ts, payload))` per key — one shuffle + one sort,
  * exactly the cost of any window aggregation, and it scales to arbitrarily
  * many right rows per key without a cross product. Equal timestamps match
  * (right rows sort before left rows at the same ts).
  */
object AsOf {

  /** @param partCols  equi-join keys present in both sides
    * @param tsCol     ordering column name present in both sides (orderable, e.g. epoch nanos)
    * @param rightCols right payload columns to carry (renamed with `prefix`)
    */
  def backward(
      left: DataFrame,
      right: DataFrame,
      partCols: Seq[String],
      tsCol: String,
      rightCols: Seq[String],
      prefix: String = "right_"): DataFrame = {

    val r = right
      .select((partCols ++ (tsCol +: rightCols)).distinct.map(col): _*)
      .withColumn("_side", lit(0))
      .withColumn("_match", struct((tsCol +: rightCols).map(col): _*))
      .select((partCols.map(col) :+ col(tsCol) :+ col("_side") :+ col("_match")): _*)

    // right rows sort before left rows at equal ts: ASOF is `left.ts >= right.ts`
    val w = Window
      .partitionBy(partCols.map(col): _*)
      .orderBy(col(tsCol), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matchedCols = (tsCol +: rightCols).map { c =>
      col("_best").getField(c).as(prefix + c)
    }
    left
      .withColumn("_side", lit(1))
      .unionByName(r, allowMissingColumns = true)
      .withColumn("_best", max(col("_match")).over(w))
      .filter(col("_side") === 1)
      .select(left.columns.toIndexedSeq.map(col) ++ matchedCols: _*)
  }

  /** Forward as-of join: for each left row, the EARLIEST right row with
    * `right.ts >= left.ts` — the symmetric construction (running `min` over
    * the following frame; right rows sort after left rows at equal ts, so
    * equal timestamps match). Same single-shuffle cost as [[backward]].
    */
  def forward(
      left: DataFrame,
      right: DataFrame,
      partCols: Seq[String],
      tsCol: String,
      rightCols: Seq[String],
      prefix: String = "right_"): DataFrame = {

    val r = right
      .select((partCols ++ (tsCol +: rightCols)).distinct.map(col): _*)
      .withColumn("_side", lit(2))
      .withColumn("_match", struct((tsCol +: rightCols).map(col): _*))
      .select((partCols.map(col) :+ col(tsCol) :+ col("_side") :+ col("_match")): _*)

    val w = Window
      .partitionBy(partCols.map(col): _*)
      .orderBy(col(tsCol), col("_side"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)

    val matchedCols = (tsCol +: rightCols).map { c =>
      col("_best").getField(c).as(prefix + c)
    }
    left
      .withColumn("_side", lit(1))
      .unionByName(r, allowMissingColumns = true)
      .withColumn("_best", min(col("_match")).over(w))
      .filter(col("_side") === 1)
      .select(left.columns.toIndexedSeq.map(col) ++ matchedCols: _*)
  }
}
