package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Enrich stage — broadcast-hash-join lookup dimensions onto every turn
  * (SURVEY.md §2.13-joins; reference analog: resourceprocessor upserting
  * fixed resource attrs, `processor/resourceprocessor/resource_processor.go`).
  *
  * Both dims are tiny (4 and 12 rows) → explicit `broadcast()` hint so the
  * plan is BroadcastHashJoinExec — narrow, shuffle-free, and it stays that
  * way at 10^12 rows because the build side never grows with the fact side.
  */
object Enrich {

  /** Inner join on role (all roles exist in role_dim), left join on tool
    * ("" = non-tool turn → family/owner default to "none").
    */
  def enrich(parsed: DataFrame, roleDim: DataFrame, toolDim: DataFrame): DataFrame =
    parsed
      .join(broadcast(roleDim), Seq("role"), "left")
      .join(broadcast(toolDim), Seq("tool"), "left")
      .withColumn("role_kind", coalesce(col("role_kind"), lit("unknown")))
      .withColumn("is_human", coalesce(col("is_human"), lit(false)))
      .withColumn("tool_family", coalesce(col("tool_family"), lit("none")))
      .withColumn("owner", coalesce(col("owner"), lit("none")))
}
