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
    require(granule > 0, s"granule must be positive: $granule")
    // symmetric collision check: ANY shared non-key name breaks the join
    // output (ambiguous references or silent duplicate columns), not just
    // pointCol; `_g` is reserved for the granule
    val shared = (points.columns.toSet -- keyCols)
      .intersect(intervals.columns.toSet -- keyCols)
    require(shared.isEmpty,
      s"column collision between sides (rename first): $shared")
    require(!points.columns.contains("_g") && !intervals.columns.contains("_g"),
      "column name _g is reserved by the range join")

    def g(c: Column): Column = floor(c / granule)
    def finiteBound(df: DataFrame, name: String): Column = {
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
    val start = finiteBound(intervals, startCol)
    // end < start is a data bug: the guard rides the exploded granule
    // computation so it cannot be pruned
    val gEnd = when(col(endCol) < col(startCol), raise_error(concat(
        lit("range join interval has end < start: "),
        col(startCol).cast("string"), lit(" > "), col(endCol).cast("string")))
        .cast("long"))
      .otherwise(g(finiteBound(intervals, endCol)))
    val exploded = intervals.withColumn("_g",
      explode(sequence(g(start), gEnd)))
    val keyed = points.withColumn("_g", g(col(pointCol)))
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
    * the FIRST shared one (`max` of the two start granules) — dedup by
    * arithmetic, no distinct exchange. Same guards: non-finite or inverted
    * bounds raise; null bounds never match; `granule` ≈ typical width.
    */
  def intervalOverlap(left: DataFrame, lStartCol: String, lEndCol: String,
                      right: DataFrame, rStartCol: String, rEndCol: String,
                      granule: Double,
                      keyCols: Seq[String] = Nil): DataFrame = {
    require(granule > 0, s"granule must be positive: $granule")
    val shared = (left.columns.toSet -- keyCols)
      .intersect(right.columns.toSet -- keyCols)
    require(shared.isEmpty,
      s"column collision between sides (rename first): $shared")
    require(!left.columns.contains("_g") && !right.columns.contains("_g"),
      "column name _g is reserved by the range join")

    def g(c: Column): Column = floor(c / granule)
    def side(df: DataFrame, startCol: String, endCol: String): DataFrame = {
      def finiteBound(name: String): Column = {
        val c = col(name)
        df.schema(name).dataType match {
          case org.apache.spark.sql.types.DoubleType |
               org.apache.spark.sql.types.FloatType =>
            when(isnan(c) || abs(c) === Double.PositiveInfinity,
              raise_error(concat(
                lit(s"range join bound $name is not finite: "),
                c.cast("string"))).cast(df.schema(name).dataType))
              .otherwise(c)
          case _ => c
        }
      }
      val gEnd = when(col(endCol) < col(startCol), raise_error(concat(
          lit("range join interval has end < start: "),
          col(startCol).cast("string"), lit(" > "),
          col(endCol).cast("string"))).cast("long"))
        .otherwise(g(finiteBound(endCol)))
      df.withColumn("_g", explode(sequence(g(finiteBound(startCol)), gEnd)))
    }
    side(left, lStartCol, lEndCol)
      .join(side(right, rStartCol, rEndCol), keyCols :+ "_g")
      .where(col(lStartCol) <= col(rEndCol) &&
        col(rStartCol) <= col(lEndCol) &&
        // emit each overlapping pair exactly once: at the first granule
        // both cover (overlap ⇒ that granule is shared)
        col("_g") === greatest(g(col(lStartCol)), g(col(rStartCol))))
      .drop("_g")
  }
}
