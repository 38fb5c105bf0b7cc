package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (temporal lookup) join: each left row at time t picks the single
  * right row with the greatest right-time ≤ t for the same key — the
  * "latest dimension snapshot as of this event" enrich that telemetry
  * pipelines need for slowly-changing dims (tool-config versions, rollout
  * flags) and Spark has no native operator for.
  *
  * Two strategies, identical semantics (AsOfJoinSpec proves them equal):
  *
  *  - [[asofUnion]] — both sides large. Union the tagged sides and carry
  *    the latest right payload forward with one `last(_, ignoreNulls)`
  *    running window per key. ONE shuffle of each side (hash by key for
  *    the window sort) and no join at all — crucially there is no
  *    (left × candidate-right) intermediate, so a key with a million
  *    events against a thousand snapshots never builds the 10^9-row
  *    candidate frame a range-join would.
  *  - [[asofBroadcast]] — right side is a small dim. Collapse it to one
  *    sorted snapshot array per key, broadcast, and pick the last entry
  *    ≤ t with a codegen'd array filter: the fact side stays narrow,
  *    shuffle-free, and unsorted, which is the right shape when the fact
  *    side is the 100 TB one.
  *
  * Tie semantics (both): right-time == left-time matches (inclusive, like
  * DuckDB/QuestDB ASOF JOIN). The right side must be unique per
  * (key, rightTime): a duplicate snapshot instant would make the winner
  * order-dependent, so both paths `raise_error` on one instead of
  * returning whichever row a task happened to see last — pre-aggregate
  * snapshots to one row per instant. A NULL snapshot instant is rejected
  * the same way (a timeless snapshot has no place on a timeline; silently
  * dropping it — or matching it to everything, which is what a naive
  * nulls-first window would do — both hide a data bug). Left rows with a
  * null time never match.
  *
  * Staleness bounds (QuestDB's ASOF TOLERANCE analog): include `rightTime`
  * in `payloadCols` — the matched snapshot's own time comes back as a
  * column, and a post-filter like `when(t - matched_rt <= tol, v)`
  * expresses any max-staleness rule without a dedicated operator
  * (AsOfJoinSpec shows the pattern).
  */
object AsOfJoin {

  /** Union + running-window strategy; left rows keep all their columns and
    * gain `payloadCols` (null when no right row is ≤ t).
    */
  def asofUnion(left: DataFrame, right: DataFrame, keyCols: Seq[String],
                leftTime: String, rightTime: String,
                payloadCols: Seq[String]): DataFrame = {
    checkSides(left, keyCols, payloadCols)
    val leftCols = left.columns.toSeq
    // payload travels as ONE struct so a legitimately-null payload FIELD
    // still counts as "a snapshot exists here" for last(ignoreNulls)
    val pStruct = struct(payloadCols.map(col): _*)
    val pType = right.select(pStruct.as("_p")).schema("_p").dataType
    val lStruct = struct(leftCols.map(col): _*)
    val lType = left.select(lStruct.as("_l")).schema("_l").dataType
    val keyed = keyCols.map(col)
    val lPart = left.select(keyed :+ col(leftTime).as("_t") :+
      lit(1).as("_side") :+ lStruct.as("_l") :+
      lit(null).cast(pType).as("_p"): _*)
    // null snapshot instants rejected inline: _t is consumed by the window
    // sort, so the guard cannot be pruned away
    val rPart = right
      .select(keyed :+ nullGuard(col(rightTime)).as("_t") :+
        lit(0).as("_side") :+
        lit(null).cast(lType).as("_l") :+ pStruct.as("_p"): _*)
    // right sorts before left at equal _t (side 0 < 1) → inclusive match.
    // The duplicate-instant guard rides the SAME partitioning + sort: a lag
    // layer marks a snapshot whose predecessor is a snapshot at the same
    // instant, a running max carries "a duplicate precedes this row", and
    // the raise happens on the SURVIVING left rows (a guard attached to the
    // filtered-out right rows would be optimized away — the `_side = 1`
    // filter lands between the Window and the projection). A duplicate
    // after the last left row of its key is benign by the same argument:
    // no result could have depended on it.
    val w = Window.partitionBy(keyed: _*).orderBy(col("_t"), col("_side"))
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // <=> (null-safe) for defense in depth — nulls can't reach here past
    // the nullGuard, but a plain === would silently skip them if they did
    val dupSnapshot = col("_side") === 0 && lag(col("_side"), 1).over(w) === 0 &&
      (lag(col("_t"), 1).over(w) <=> col("_t"))
    val checked = when(col("_dupSeen") === 1, raise_error(lit(
        "as-of right side has duplicate snapshot instants")).cast(pType))
      .otherwise(col("_asof"))
    lPart.unionByName(rPart)
      .withColumn("_dup", dupSnapshot)
      .withColumn("_asof", last(col("_p"), ignoreNulls = true).over(wRun))
      .withColumn("_dupSeen",
        max(when(col("_dup"), 1).otherwise(0)).over(wRun))
      .where(col("_side") === 1)
      .select(leftCols.map(c => col("_l").getField(c).as(c)) ++
        payloadCols.map(c => checked.getField(c).as(c)): _*)
  }

  /** Broadcast-dim strategy: one sorted `(rightTime, payload)` array per
    * key on the build side; the probe picks the last entry ≤ t via an
    * array filter — O(|snapshots of key|) per row, zero fact-side shuffle.
    */
  def asofBroadcast(left: DataFrame, right: DataFrame, keyCols: Seq[String],
                    leftTime: String, rightTime: String,
                    payloadCols: Seq[String]): DataFrame = {
    checkSides(left, keyCols, payloadCols)
    // sort_array orders structs lexicographically — _rt first ⇒ time order
    val sortedTl = sort_array(collect_list(
      struct(nullGuard(col(rightTime)).as("_rt") +: payloadCols.map(col): _*)))
    // duplicate-instant guard on the (tiny) aggregated frame: the sorted
    // timeline must have as many distinct instants as entries
    val timeline = right
      .groupBy(keyCols.map(col): _*)
      .agg(sortedTl.as("_tl"))
      .withColumn("_tl",
        when(size(array_distinct(transform(col("_tl"),
            e => e.getField("_rt")))) =!= size(col("_tl")),
          raise_error(lit(
            "as-of right side has duplicate snapshot instants")))
        .otherwise(col("_tl")))
    // try_element_at: an empty filtered timeline (no snapshot ≤ t) is a
    // legitimate no-match → null, not an ANSI index error
    val picked = try_element_at(
      filter(col("_tl"), e => e.getField("_rt") <= col(leftTime)), lit(-1))
    left.join(broadcast(timeline), keyCols, "left")
      .withColumn("_asof", picked)
      .select(left.columns.map(col).toSeq ++
        payloadCols.map(c => col("_asof").getField(c).as(c)): _*)
  }

  /** Argument validation shared by both strategies (the RangeJoin
    * checkSides pattern): the internal plumbing names must not collide
    * with user columns (an `_t`/`_asof`/… already on a side becomes an
    * ambiguous reference or a silently-shadowed value), and a payload
    * column that duplicates a left column would emit a duplicated output
    * name the caller can no longer address.
    */
  private val InternalNames =
    Set("_t", "_side", "_l", "_p", "_asof", "_dup", "_dupSeen", "_tl", "_rt")

  private def checkSides(left: DataFrame, keyCols: Seq[String],
                         payloadCols: Seq[String]): Unit = {
    require(keyCols.nonEmpty, "as-of join needs at least one key column")
    val clash = (left.columns.toSet ++ payloadCols).intersect(InternalNames)
    require(clash.isEmpty,
      s"as-of join reserves internal column names ${clash.mkString(", ")} — rename them")
    val dup = payloadCols.toSet.intersect(left.columns.toSet)
    require(dup.isEmpty,
      s"as-of payload columns duplicate left columns ${dup.mkString(", ")} — alias the payload")
  }

  /** Reject null snapshot instants in place (the value is consumed
    * downstream, so the check survives column pruning).
    */
  private def nullGuard(rt: Column): Column =
    when(rt.isNull, raise_error(lit(
      "as-of right side has a NULL snapshot instant"))).otherwise(rt)
}
