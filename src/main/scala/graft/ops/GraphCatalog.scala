package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph catalog: derive vertex/edge collection lists from stored edge
  * definitions — the reference's named-graph metadata walk
  * (`fetch_edge_and_vertex_collections_by_graph`,
  * /root/reference/src/graph_loader.rs:1047-1109: iterate
  * `edgeDefinitions[].{collection,from,to}`, flatten, sort+dedup
  * `:1104-1106`). Spark-first: explode + union + distinct.
  */
object GraphCatalog {

  final case class EdgeDefinition(collection: String, from: Seq[String],
                                  to: Seq[String])

  /** The fixture catalog for our KG: one edge collection per predicate,
    * linking entity vertices (mirrors the reference test graph's shape).
    */
  def fixtureDefinitions(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      EdgeDefinition("acquired", Seq("companies"), Seq("companies")),
      EdgeDefinition("founded_by", Seq("companies"), Seq("people", "companies")),
      EdgeDefinition("located_in", Seq("companies", "people"), Seq("places")),
      EdgeDefinition("partner_of", Seq("companies"), Seq("companies"))
    ).toDF
  }

  /** Distinct vertex collections referenced by any edge definition,
    * sorted — the reference's `sort(); dedup()` on the flattened from/to
    * arrays, as a Catalyst plan (explode → union → distinct → sort).
    */
  def vertexCollections(defs: DataFrame): DataFrame =
    defs.select(explode(col("from")).as("vertex_collection"))
      .union(defs.select(explode(col("to")).as("vertex_collection")))
      .distinct()
      .orderBy(col("vertex_collection"))

  /** Edge collections (names), sorted. */
  def edgeCollections(defs: DataFrame): DataFrame =
    defs.select(col("collection").as("edge_collection"))
      .distinct()
      .orderBy(col("edge_collection"))
}
