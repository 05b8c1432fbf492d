package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — for each left row, the most recent right row with
  * `right.ts <= left.ts` within the same key (time-series point-in-
  * time lookup; DuckDB/kdb call this ASOF JOIN, Spark has no native
  * operator).
  *
  * Implementation is the union-merge composition, per the custom-
  * operator preference order (compose built-ins before planner
  * surgery): tag both inputs, union, and take `last(value,
  * ignoreNulls)` over a (key, ts, tag)-ordered running window. One
  * shuffle by key + one sort — the same cost shape as a sort-merge
  * join, no range explosion; ties (right.ts == left.ts) order the
  * right row first, matching ASOF's `>=` semantics. */
object AsOf {

  /** @param left      probe side
    * @param right     build side: (keyCols, tsCol, valueCols)
    * @param keyCols   equi-join keys present on both sides
    * @param tsCol     event-time column name present on both sides
    * @param valueCols right-side columns to carry (prefixed `asof_`)
    * @return left rows + `asof_<valueCol>` columns (null when no
    *         right row precedes the left row) */
  def asofJoin(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      tsCol: String, valueCols: Seq[String]): DataFrame = {
    val leftCols = left.columns
    // one struct payload per right row (instead of last() per value
    // column): the struct is non-null on EVERY right row even when its
    // fields are null, so the most recent matching right row wins with
    // its null values intact — native ASOF semantics, not a skip-back
    // to an older non-null row.
    val payloadType = org.apache.spark.sql.types.StructType(valueCols.map(c =>
      org.apache.spark.sql.types.StructField(c, right.schema(c).dataType,
        nullable = true)))
    val lTagged = left
      .withColumn("_tag", lit(1))
      .select(keyCols.map(col) ++ Seq(col(tsCol).as("_ts"), col("_tag")) ++
        leftCols.filterNot(c => keyCols.contains(c) || c == tsCol).map(col) :+
        lit(null).cast(payloadType).as("_asof"): _*)
    val rTagged = right
      .withColumn("_tag", lit(0))
      .select(keyCols.map(col) ++ Seq(col(tsCol).as("_ts"), col("_tag")) ++
        leftCols.filterNot(c => keyCols.contains(c) || c == tsCol)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(valueCols.map(c => col(c).as(c)): _*).as("_asof"): _*)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("_ts").asc, col("_tag").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = lTagged.unionByName(rTagged)
      .withColumn("_asof", last(col("_asof"), ignoreNulls = true).over(w))
    valueCols.foldLeft(filled) { (df, c) =>
      df.withColumn(s"asof_$c", col("_asof").getField(c))
    }
      .filter(col("_tag") === 1)
      .withColumnRenamed("_ts", tsCol)
      .drop("_tag", "_asof")
  }
}
