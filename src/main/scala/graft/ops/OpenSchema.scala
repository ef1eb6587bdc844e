package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** All-attributes / open-schema mode (SURVEY.md §1.4).
  *
  * The reference loads the whole document as one value when
  * `load_all_vertex_attributes` is set (/root/reference/src/config.rs:88-95,
  * graph_loader.rs:448-450) instead of projecting named fields. Spark-first
  * re-expression: fold every non-id column into a `props: map<string,string>`
  * column (values stringified, nulls dropped — schemaless-payload shape),
  * and project back out with `props['k']`. Both directions are single
  * narrow codegen'd projections — no UDF, no shuffle. A projection of
  * `props['k']` right after [[allAttributes]] does NOT fold with Spark's
  * built-in `SimplifyExtractValueOps` (the `map_filter` blocks it); the
  * injected [[graft.plans.SimplifyOpenSchemaProjection]] rule folds the
  * round-trip to the bare column, so with [[graft.plans.GraftExtensions]]
  * the open-schema API costs nothing when a query only touches named keys.
  */
object OpenSchema {

  /** (id, props) where props maps every other column name to its value
    * stringified; null values are omitted (map_from_entries would keep
    * them — the reference's JSON docs simply lack absent fields).
    */
  def allAttributes(df: DataFrame, idCol: String): DataFrame = {
    val attrs = df.columns.filterNot(_ == idCol)
    val entries: Seq[Column] = attrs.toSeq.flatMap(c =>
      Seq(lit(c), col(c).cast("string")))
    df.select(
      col(idCol),
      map_filter(map(entries: _*), (_, v) => v.isNotNull).as("props"))
  }

  /** Project a typed column back out of the open-schema map. */
  def prop(key: String, dataType: String = "string"): Column =
    col("props")(key).cast(dataType).as(key)
}
