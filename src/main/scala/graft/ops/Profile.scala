package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ANALYZE-style column profiling — the data-card / catalog-stats
  * sweep run over every new table before it enters a pipeline
  * (null rates, cardinalities, ranges, dominant values). Complements
  * the corpus-specific report ([[CorpusReport]], `t91`): this one is
  * schema-generic.
  *
  * Scale shape: exactly TWO jobs regardless of column count. Pass 1
  * is a single no-groupBy aggregate computing row count plus per-
  * column non-null count and typed min/max (map-side combined, one
  * row out). Pass 2 melts the requested columns into (col, value)
  * pairs — K× the rows but ONE shuffle — and a single
  * (col, value) aggregation yields exact distinct counts and the
  * dominant value per column (ties broken by value). No per-column
  * job loop, no driver iteration over data.
  */
object Profile {

  /** One row per requested column: (col_name, n_rows, n_nulls,
    * n_distinct, min_s, max_s, top_val, top_n). min/max compute on
    * the NATIVE type (numeric/timestamp ordering, not string order)
    * and render to string; top_val is the most frequent non-null
    * value rendered to string, smallest value on ties.
    */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val missing = cols.filterNot(df.columns.contains)
    require(missing.isEmpty, s"unknown columns: ${missing.mkString(", ")}")

    // pass 1: one aggregate row — count/nulls/min/max per column
    val aggs = count(lit(1)).as("__n") +:
      cols.flatMap { c =>
        Seq(count(col(c)).as(s"__nn_$c"),
          min(col(c)).cast("string").as(s"__min_$c"),
          max(col(c)).cast("string").as(s"__max_$c"))
      }
    val basic = df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(cols.map { c =>
        struct(lit(c).as("col_name"), col("__n").as("n_rows"),
          (col("__n") - col(s"__nn_$c")).as("n_nulls"),
          col(s"__min_$c").as("min_s"), col(s"__max_$c").as("max_s"))
      }: _*)).as("p"))
      .select(col("p.*"))

    // pass 2: melt + one (col, value) aggregation
    val melted = df.select(explode(array(cols.map { c =>
        struct(lit(c).as("col_name"), col(c).cast("string").as("v"))
      }: _*)).as("m"))
      .select(col("m.*"))
      .filter(col("v").isNotNull)
    val byValue = melted.groupBy(col("col_name"), col("v"))
      .agg(count(lit(1)).as("vn"))
    // distinct count + exact mode (count desc, value asc tie-break)
    // from ONE exchange: two window functions over the same
    // col_name partitioning of the distinct-value-bounded table
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("col_name"))
    val wOrd = w.orderBy(col("vn").desc, col("v").asc)
    val top = byValue
      .withColumn("__rk", row_number().over(wOrd))
      .withColumn("n_distinct", count(lit(1)).over(w))
      .filter(col("__rk") === 1)
      .select(col("col_name"), col("n_distinct"),
        col("v").as("top_val"), col("vn").as("top_n"))

    // LEFT join: an all-NULL column has no pass-2 rows but must still
    // report (n_nulls = n_rows, n_distinct = 0) rather than vanish
    basic.join(top, Seq("col_name"), "left")
      .select(col("col_name"), col("n_rows"), col("n_nulls"),
        coalesce(col("n_distinct"), lit(0L)).as("n_distinct"),
        col("min_s"), col("max_s"), col("top_val"),
        coalesce(col("top_n"), lit(0L)).as("top_n"))
  }
}
