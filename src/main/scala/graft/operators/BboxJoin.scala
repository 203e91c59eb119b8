package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bounding-box overlap join with exact integer IoU — the spatial
  * primitive under detection dedup, segmentation agreement scoring
  * and region-proposal matching. Inputs are component/box tables
  * (comp, ymin, ymax, xmin, xmax — inclusive integer bounds, the
  * shape [[LabelComponents.componentStats2d]] emits).
  *
  * Scale shape: a naive overlap join is an inequality join (nested
  * loop). Instead each box explodes onto the coarse GRID CELLS it
  * touches and the join is an EQUI-join on cell plus the overlap
  * predicate — shuffle-hash-joinable at any box count. A pair whose
  * boxes share k cells would emit k duplicates; the standard
  * reference-point rule (count the pair only in the cell that
  * contains the intersection's top-left corner) keeps exactly one,
  * with no distinct pass.
  *
  * IoU is exact micro units: inter·10⁶ div (areaA + areaB − inter),
  * all Long arithmetic on inclusive bounds.
  */
object BboxJoin {

  def iouPairs(a: DataFrame, b: DataFrame, cell: Long = 64L): DataFrame = {
    require(cell >= 1, s"cell must be >= 1, got $cell")
    def boxes(df: DataFrame, p: String) =
      df.select(col("comp").cast("long").as(s"${p}comp"),
          col("ymin").cast("long").as(s"${p}ymin"),
          col("ymax").cast("long").as(s"${p}ymax"),
          col("xmin").cast("long").as(s"${p}xmin"),
          col("xmax").cast("long").as(s"${p}xmax"))
        .withColumn(s"${p}cell", explode(expr(
          s"flatten(transform(sequence(${p}ymin div $cell, ${p}ymax div $cell), " +
            s"cy -> transform(sequence(${p}xmin div $cell, ${p}xmax div $cell), " +
            s"cx -> struct(cy, cx))))")))
    val A = boxes(a, "a_")
    val B = boxes(b, "b_")
    A.join(B, col("a_cell") === col("b_cell") &&
        col("a_ymin") <= col("b_ymax") && col("b_ymin") <= col("a_ymax") &&
        col("a_xmin") <= col("b_xmax") && col("b_xmin") <= col("a_xmax") &&
        // reference point: the intersection's top-left cell owns the pair
        expr(s"a_cell.cy = greatest(a_ymin, b_ymin) div $cell") &&
        expr(s"a_cell.cx = greatest(a_xmin, b_xmin) div $cell"))
      .selectExpr("a_comp AS comp_a", "b_comp AS comp_b",
        "(least(a_ymax, b_ymax) - greatest(a_ymin, b_ymin) + 1) * " +
          "(least(a_xmax, b_xmax) - greatest(a_xmin, b_xmin) + 1) AS inter_area",
        "(a_ymax - a_ymin + 1) * (a_xmax - a_xmin + 1) AS area_a",
        "(b_ymax - b_ymin + 1) * (b_xmax - b_xmin + 1) AS area_b")
      .selectExpr("comp_a", "comp_b", "inter_area",
        "inter_area * 1000000 div (area_a + area_b - inter_area) AS iou_micro")
  }
}
