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
  * or a non-finite floating bound fails fast (raise_error) rather than
  * silently vanishing — floor(NaN) lands every-NaN in granule 0 and
  * floor(±Inf) makes sequence() explode, so a NaN/Inf bound would
  * otherwise LOSE matches or kill the job where the naive non-equi join
  * succeeds. Non-finite POINTS need no guard: their granule matches no
  * interval and the containment filter (Spark's NaN-safe comparisons)
  * agrees with the naive form.
  */
object RangeJoin {

  def pointInInterval(points: DataFrame, pointCol: String,
                      intervals: DataFrame, startCol: String, endCol: String,
                      granule: Double,
                      keyCols: Seq[String] = Nil): DataFrame = {
    checkSides(points, intervals, keyCols, granule)
    val exploded = explodeToGranules(intervals, startCol, endCol, granule)
    val keyed = points.withColumn("_g", floor(col(pointCol) / granule))
    keyed.join(exploded, keyCols :+ "_g")
      .where(col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop("_g")
  }

  /** Interval-overlap join: every (left, right) pair whose CLOSED intervals
    * intersect (`aStart ≤ bEnd && bStart ≤ aEnd`) — sessions × incidents,
    * conversations × deploy windows. Same granule trick as
    * [[pointInInterval]]: both sides explode to covered granules and
    * equi-join; a pair overlapping several shared granules would surface
    * once per granule, so the candidate is kept only where the granule is
    * the FIRST shared one (`max` of the two start granules, which overlap
    * guarantees both sides cover) — dedup by arithmetic, no distinct
    * exchange. Same guards as [[pointInInterval]]: non-finite or inverted
    * bounds raise; null bounds never match; `granule` ≈ typical width.
    */
  def intervalOverlap(left: DataFrame, lStartCol: String, lEndCol: String,
                      right: DataFrame, rStartCol: String, rEndCol: String,
                      granule: Double,
                      keyCols: Seq[String] = Nil): DataFrame = {
    checkSides(left, right, keyCols, granule)
    def g(c: Column): Column = floor(c / granule)
    explodeToGranules(left, lStartCol, lEndCol, granule)
      .join(explodeToGranules(right, rStartCol, rEndCol, granule),
        keyCols :+ "_g")
      .where(col(lStartCol) <= col(rEndCol) &&
        col(rStartCol) <= col(lEndCol) &&
        col("_g") === greatest(g(col(lStartCol)), g(col(rStartCol))))
      .drop("_g")
  }

  /** Shared argument validation: symmetric collision check (ANY shared
    * non-key name breaks the join output — ambiguous references or silent
    * duplicate columns), `_g` reserved for the granule.
    */
  private def checkSides(a: DataFrame, b: DataFrame, keyCols: Seq[String],
                         granule: Double): Unit = {
    require(granule > 0, s"granule must be positive: $granule")
    val shared = (a.columns.toSet -- keyCols)
      .intersect(b.columns.toSet -- keyCols)
    require(shared.isEmpty,
      s"column collision between sides (rename first): $shared")
    require(!a.columns.contains("_g") && !b.columns.contains("_g"),
      "column name _g is reserved by the range join")
  }

  /** One row per integer granule the CLOSED interval [start, end] covers,
    * as column `_g`. The fail-fast guards (end < start; non-finite
    * floating bound) ride the granule computation so they cannot be
    * pruned away.
    */
  private def explodeToGranules(df: DataFrame, startCol: String,
                                endCol: String, granule: Double): DataFrame = {
    def g(c: Column): Column = floor(c / granule)
    def finiteBound(name: String): Column = {
      val c = col(name)
      df.schema(name).dataType match {
        case org.apache.spark.sql.types.DoubleType |
             org.apache.spark.sql.types.FloatType =>
          when(isnan(c) || abs(c) === Double.PositiveInfinity,
            raise_error(concat(lit(s"range join bound $name is not finite: "),
              c.cast("string"))).cast(df.schema(name).dataType))
            .otherwise(c)
        case _ => c
      }
    }
    val gEnd = when(col(endCol) < col(startCol), raise_error(concat(
        lit("range join interval has end < start: "),
        col(startCol).cast("string"), lit(" > "), col(endCol).cast("string")))
        .cast("long"))
      .otherwise(g(finiteBound(endCol)))
    df.withColumn("_g", explode(sequence(g(finiteBound(startCol)), gEnd)))
  }
}
