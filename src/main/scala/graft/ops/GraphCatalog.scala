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

  /** Collection lists resolved from a catalog, driver-side — what a caller
    * feeds into a pipeline/scan config (the reference builds its load plan
    * from exactly these lists, graph_loader.rs:328-343).
    */
  final case class GraphSpec(graph: String, edgeCollections: Seq[String],
                             vertexCollections: Seq[String])

  /** Named-graph mode (the reference's `new_named`,
    * /root/reference/src/graph_loader.rs:328-352): look the graph up in a
    * STORED catalog table with columns (graph, collection, from, to) and
    * derive its collection lists. Works over any user-supplied catalog
    * DataFrame — nothing is hard-coded.
    */
  def named(catalog: DataFrame, graphName: String): GraphSpec = {
    // ONE action: collect the (tiny, filtered) definitions and derive both
    // lists driver-side — isEmpty + two collects would run the catalog scan
    // three times.
    val rows = catalog.where(col("graph") === graphName)
      .select(col("collection"), col("from"), col("to"))
      .collect()
    if (rows.isEmpty) throw new graft.GraphNotInCatalog(graphName)
    GraphSpec(
      graphName,
      rows.map(_.getString(0)).distinct.sorted.toSeq,
      rows.flatMap(r => r.getSeq[String](1) ++ r.getSeq[String](2))
        .distinct.sorted.toSeq)
  }

  /** Custom-graph mode (the reference's `new_custom`,
    * graph_loader.rs:354-375): the caller supplies the edge definitions
    * directly; collection lists are derived, sorted, deduplicated.
    */
  def custom(defs: DataFrame, name: String = "custom"): GraphSpec =
    fromDefinitions(name, defs)

  private def fromDefinitions(name: String, defs: DataFrame): GraphSpec = {
    val spark = defs.sparkSession
    import spark.implicits._
    GraphSpec(
      name,
      edgeCollections(defs).as[String].collect().toSeq,
      vertexCollections(defs).as[String].collect().toSeq)
  }
}
