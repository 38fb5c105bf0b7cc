package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** attributesprocessor action engine over a dynamic attribute map column
  * (SURVEY.md §2.3; ref `internal/processor/attraction/attraction.go:
  * NewAttrProc / AttrProc.Process`).
  *
  * The reference mutates an ordered AttributeMap in place; here each action
  * is a pure `Column→Column` map transform (map_concat / map_filter /
  * transform_values — all codegen'd higher-order functions, no UDF). Actions
  * compose left-to-right like the reference's config list.
  */
sealed trait AttrAction { def apply(attrs: Column): Column }

object AttrActions {

  private def without(attrs: Column, key: String): Column =
    map_filter(attrs, (k, _) => k =!= lit(key))

  private def set(attrs: Column, key: String, value: Column): Column =
    map_concat(without(attrs, key), map(lit(key), value))

  /** set key only if absent (ref attraction.go INSERT). */
  final case class Insert(key: String, value: String) extends AttrAction {
    def apply(attrs: Column): Column =
      when(element_at(attrs, key).isNotNull, attrs)
        .otherwise(map_concat(attrs, map(lit(key), lit(value))))
  }

  /** set only if present (UPDATE). */
  final case class Update(key: String, value: String) extends AttrAction {
    def apply(attrs: Column): Column =
      when(element_at(attrs, key).isNull, attrs)
        .otherwise(set(attrs, key, lit(value)))
  }

  /** unconditional set (UPSERT). */
  final case class Upsert(key: String, value: String) extends AttrAction {
    def apply(attrs: Column): Column = set(attrs, key, lit(value))
  }

  /** remove key (DELETE). */
  final case class Delete(key: String) extends AttrAction {
    def apply(attrs: Column): Column = without(attrs, key)
  }

  /** SHA-1 the value in place (HASH; ref attraction.go sha1Hasher). */
  final case class Hash(key: String) extends AttrAction {
    def apply(attrs: Column): Column =
      transform_values(attrs, (k, v) =>
        when(k === lit(key), sha1(encode(v, "UTF-8"))).otherwise(v))
  }

  /** regex named groups over attrs[key]; each group becomes an attribute
    * (EXTRACT; ref attraction.go extractAttributes). Uses the one-pass
    * [[graft.expr.GrokExtract]] expression.
    */
  final case class Extract(key: String, pattern: String) extends AttrAction {
    def apply(attrs: Column): Column = {
      val g = graft.expr.GrokExtract.grok_extract(element_at(attrs, key), pattern)
      val names = groupNames(pattern)
      val pairs = names.flatMap(n => Seq(lit(n), g.getField(n)))
      val extracted = map_filter(map(pairs: _*), (_, v) => v.isNotNull)
      when(element_at(attrs, key).isNull, attrs)
        .otherwise(map_concat(
          map_filter(attrs, (k, _) => !k.isin(names.map(lit): _*)),
          coalesce(extracted, map())))
    }
  }

  private[graft] def groupNames(pattern: String): Seq[String] =
    "\\(\\?<([A-Za-z][A-Za-z0-9_]*)>".r
      .findAllMatchIn(pattern).map(_.group(1)).toSeq

  private def grokAsMap(text: Column, pattern: String): Column = {
    val g = graft.expr.GrokExtract.grok_extract(text, pattern)
    // Null group values (optional groups that didn't capture) are dropped
    // by concatenating conditional singleton maps rather than map_filter:
    // map_filter is a higher-order function (CodegenFallback), and using
    // it here would knock the whole to_attributes projection — including
    // every grok_extract call — out of whole-stage codegen on the hot
    // parse path. when/map/map_concat all codegen; group names are unique
    // within a regex, so EXCEPTION dedup policy can't fire.
    val perGroup = groupNames(pattern).map { n =>
      val v = g.getField(n)
      when(v.isNotNull, map(lit(n), v)).otherwise(map())
    }
    when(g.isNotNull, map_concat(perGroup: _*))
  }

  /** spanprocessor `to_attributes` rule LIST (SURVEY.md §2.8; ref
    * `processor/spanprocessor/span.go: processToAttributes` applying the
    * ordered `rules:` config): each rule is a regex with named groups over
    * a text column, evaluated in order.
    *
    *  - `breakAfterMatch = true` (reference default semantics for
    *    `break_after_match`): the FIRST matching rule contributes its
    *    groups and later rules are skipped — a single `coalesce` over the
    *    per-rule maps, one narrow codegen'd projection.
    *  - `breakAfterMatch = false`: every matching rule contributes; later
    *    rules overwrite earlier ones on key collision (the reference
    *    re-sets the attribute map entry per rule, last writer wins). The
    *    merge is an explicit earlier-minus-later `map_filter` before
    *    `map_concat` because Spark's default `mapKeyDedupPolicy=EXCEPTION`
    *    makes a plain concat with duplicate keys a runtime error. (The
    *    `map_filter` HOF is CodegenFallback, so merge mode trades codegen
    *    for collision semantics; the default first-match mode stays fully
    *    codegen'd — Round3Spec plan gate.)
    *
    * Returns a map column (possibly empty; never null).
    */
  def toAttributes(text: Column, rules: Seq[String],
                   breakAfterMatch: Boolean = true): Column = {
    require(rules.nonEmpty, "to_attributes: empty rule list")
    val maps = rules.map(grokAsMap(text, _))
    if (breakAfterMatch) coalesce(maps :+ map(): _*)
    else maps.map(m => coalesce(m, map())).reduce { (acc, m) =>
      map_concat(map_filter(acc, (k, _) => !map_contains_key(m, k)), m)
    }
  }

  /** Apply an ordered action list to `col`, like the reference's
    * `actions:` config block.
    */
  def process(df: DataFrame, attrsCol: String, actions: Seq[AttrAction]): DataFrame =
    df.withColumn(attrsCol,
      actions.foldLeft(col(attrsCol))((c, a) => a(c)))

  /** filterspan-style include/exclude scoping (SURVEY.md §2.3, ref
    * `internal/processor/filterspan/filterspan.go: SkipSpan`): actions
    * apply only to rows matched by `include` and not by `exclude`; all
    * other rows pass through UNCHANGED. Row-level conditional apply —
    * `when(pred, transformed).otherwise(original)` — so the whole thing
    * stays one narrow codegen'd projection, exactly like the reference's
    * per-span skip check, with no branch in the plan.
    */
  final case class MatchProps(include: Option[Column] = None,
                              exclude: Option[Column] = None) {
    def pred: Column = {
      val inc = include.getOrElse(lit(true))
      exclude.map(e => inc && !coalesce(e, lit(false))).getOrElse(inc)
    }
  }

  def processScoped(df: DataFrame, attrsCol: String,
                    actions: Seq[AttrAction], scope: MatchProps): DataFrame = {
    val transformed = actions.foldLeft(col(attrsCol))((c, a) => a(c))
    df.withColumn(attrsCol,
      when(coalesce(scope.pred, lit(false)), transformed)
        .otherwise(col(attrsCol)))
  }
}
