package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (point-in-interval) join: each point row matches every interval
  * row with `start ≤ point ≤ end` (inclusive), optionally also equi-keyed.
  * Spark has no native range-join operator — without an equality key the
  * planner falls back to BroadcastNestedLoop/Cartesian, the O(points ×
  * intervals) shape that dies at scale.
  *
  * Strategy: granule bucketing. Every interval is exploded to the integer
  * granules it covers (`floor(start/granule) .. floor(end/granule)`),
  * every point computes its single granule, and the join becomes a plain
  * shuffled EQUI-join on (keys…, granule) followed by the exact
  * containment filter — Catalyst gets hash partitioning, AQE gets skew
  * handling, and no nested loop ever forms. Work is
  * O(points + intervals × (width/granule + 1) + true matches).
  *
  * Choosing `granule`: about the TYPICAL interval width. Too small →
  * interval explosion (width/granule rows per interval); too large → many
  * false candidates per bucket filtered post-join. Both degrade smoothly;
  * the result is identical at any granule (RangeJoinSpec proves it).
  *
  * Semantics: inclusive on both ends; rows with a null point, start, or
  * end never match (inner-join convention); an interval with end < start
  * fails fast (raise_error) rather than silently vanishing.
  */
object RangeJoin {

  def pointInInterval(points: DataFrame, pointCol: String,
                      intervals: DataFrame, startCol: String, endCol: String,
                      granule: Double,
                      keyCols: Seq[String] = Nil): DataFrame = {
    require(granule > 0, s"granule must be positive: $granule")
    val overlap = (keyCols.toSet + pointCol)
      .intersect(intervals.columns.toSet -- keyCols)
    require(overlap.isEmpty,
      s"column collision between sides (rename first): $overlap")

    def g(c: Column): Column = floor(c / granule)
    // end < start is a data bug: the guard rides the exploded granule
    // computation so it cannot be pruned
    val gEnd = when(col(endCol) < col(startCol), raise_error(concat(
        lit("range join interval has end < start: "),
        col(startCol).cast("string"), lit(" > "), col(endCol).cast("string")))
        .cast("long"))
      .otherwise(g(col(endCol)))
    val exploded = intervals.withColumn("_g",
      explode(sequence(g(col(startCol)), gEnd)))
    val keyed = points.withColumn("_g", g(col(pointCol)))
    keyed.join(exploded, keyCols :+ "_g")
      .where(col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop("_g")
  }
}
