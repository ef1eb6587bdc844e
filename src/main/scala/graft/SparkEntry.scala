package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.canon.ConnectedComponents
import graft.link.Mentions
import graft.synth.PageSynth
import graft.triples.TripleExtract

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` covers the operator inventory of SURVEY.md §2: every operator
  * the reference implements (scan, projection, computed scalar, validation
  * filter, dedup, distinct) re-expressed Spark-first, plus the operators the
  * KG pipeline adds (joins, aggregation, window, sort/top-k, set ops,
  * connected components, linking). SQL-expressible entries carry a DuckDB
  * oracle over the same parquet tables; KG-pipeline entries run on the
  * deterministic synthesized pages table (rows-only check) and are exactly
  * verified in `sbt test` against golden fixtures instead.
  */
object SparkEntry {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** Flagship: full KG build on synthesized pages — returns the canonical
    * edge (triple) table. Driver smoke-checks rows > 0 on sf0.001.
    */
  def entry(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val pages = PageSynth.pages(spark, 42L, 400L, 8)
      .map(p => Page(p.url, p.warc_ts, p.html,
        graft.extract.HtmlText.extract(p.html), p.lang))
    val dict = PageSynth.aliasDictionary
    val linked = Mentions.link(Mentions.scan(pages, dict), PageSynth.aliases(spark))
    val cands = TripleExtract.candidates(pages, dict.map(_.alias).distinct,
      PageSynth.relations.toMap)
    val canon = ConnectedComponents.components(
      PageSynth.sameAs(spark).toDF("src", "dst"))
    TripleExtract.canonicalize(
      TripleExtract.triples(cands, linked), canon).toDF
  }

  /** Shared KG sub-pipeline for the kg_* query entries (deterministic,
    * independent of sfDir).
    */
  private def kgPages(s: SparkSession) = {
    import s.implicits._
    PageSynth.pages(s, 42L, 400L, 8).map(p =>
      Page(p.url, p.warc_ts, p.html,
        graft.extract.HtmlText.extract(p.html), p.lang))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- reference operator inventory over driver tables (oracle-backed) --
    "s1_scan_project" -> ((s, dir) => {
      // S1+P1: partitioned scan with projection+predicate pushdown.
      t(s, dir, "documents")
        .select(col("doc_id"), col("lang"), col("n_chars"))
        .where(col("lang") === "en")
    }),
    "p4_collection_name" -> ((s, dir) => {
      // P4: `@collection_name` = substring of id before first '/'
      // (reference: /root/reference/src/graph_loader.rs:51-56).
      t(s, dir, "documents")
        .withColumn("id", concat(col("source"), lit("/"), col("doc_id").cast("string")))
        .select(col("doc_id"), col("id"),
          substring_index(col("id"), "/", 1).as("collection"))
    }),
    "f1_validation_filter" -> ((s, dir) => {
      // F1: reject malformed rows (reference hard-fails; we count + filter).
      t(s, dir, "documents")
        .agg(
          count(lit(1)).as("n_rows"),
          sum(when(col("text").isNotNull && length(col("text")) > 0, 1L)
            .otherwise(0L)).as("n_valid"))
    }),
    "a1_distinct" -> ((s, dir) =>
      // A1/A2: distinct (field-union / collection-name dedup analog).
      t(s, dir, "documents").select(col("lang")).distinct()),
    "q_agg_group" -> ((s, dir) =>
      t(s, dir, "documents").groupBy(col("lang")).agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("total_chars"),
        min(col("doc_id")).as("min_doc"))),
    "q_join_broadcast" -> ((s, dir) => {
      // Entity-link-shaped join: big fact × small broadcast dim.
      val orders = t(s, dir, "orders")
      val cust = t(s, dir, "customer")
      orders.join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment").as("segment"))
        .agg(count(lit(1)).as("n_orders"),
          round(sum(col("o_totalprice")), 2).as("revenue"))
        .select(col("segment"), col("n_orders"), col("revenue"))
    }),
    "q_join_sortmerge" -> ((s, dir) => {
      // Large-large join → shuffle (sort-merge/shuffled-hash under AQE).
      val li = t(s, dir, "lineitem")
      val orders = t(s, dir, "orders")
      li.join(orders, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_lines"),
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
            .as("revenue"))
    }),
    "q_window_topk" -> ((s, dir) => {
      val w = Window.partitionBy(col("lang"))
        .orderBy(col("n_chars").desc, col("doc_id").asc)
      t(s, dir, "documents")
        .withColumn("rn", row_number().over(w))
        .where(col("rn") <= 3)
        .select(col("lang"), col("doc_id"), col("n_chars"), col("rn"))
    }),
    "q_sort_limit" -> ((s, dir) =>
      t(s, dir, "documents")
        .orderBy(col("n_chars").desc, col("doc_id").asc)
        .select(col("doc_id"), col("n_chars"))
        .limit(10)),
    "q_set_ops" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      d.where(col("lang") === "en").select(col("doc_id"))
        .except(d.where(col("n_chars") < 150).select(col("doc_id")))
    }),
    "dedup_exact" -> ((s, dir) =>
      // Exact dedup via hash-groupBy: keep min doc_id per text.
      t(s, dir, "documents")
        .groupBy(col("text"))
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
        .select(col("keep_id"), col("n_copies"))),

    // ---- KG pipeline stages on the synthesized pages table (rows-only) ---
    "kg_extract" -> ((s, _) => {
      import s.implicits._
      kgPages(s).map(p => (p.url, p.text.length, p.lang))
        .toDF("url", "text_len", "lang")
    }),
    "kg_mentions" -> ((s, _) =>
      Mentions.scan(kgPages(s), PageSynth.aliasDictionary).toDF),
    "kg_linked" -> ((s, _) =>
      Mentions.link(
        Mentions.scan(kgPages(s), PageSynth.aliasDictionary),
        PageSynth.aliases(s)).toDF),
    "kg_triples" -> ((s, _) => {
      val dict = PageSynth.aliasDictionary
      val pages = kgPages(s)
      val linked = Mentions.link(Mentions.scan(pages, dict), PageSynth.aliases(s))
      val cands = TripleExtract.candidates(pages, dict.map(_.alias).distinct,
        PageSynth.relations.toMap)
      TripleExtract.triples(cands, linked).toDF
    }),
    "kg_cc" -> ((s, _) => {
      import s.implicits._
      ConnectedComponents.components(
        PageSynth.sameAs(s).toDF("src", "dst"))
    }),
    "kg_edges" -> ((s, _) => entry(s))
  )

  def oracleSql: Map[String, String] = Map(
    "s1_scan_project" ->
      "SELECT doc_id, lang, n_chars FROM documents WHERE lang = 'en'",
    "p4_collection_name" ->
      ("SELECT doc_id, source || '/' || CAST(doc_id AS VARCHAR) AS id, " +
        "split_part(source || '/' || CAST(doc_id AS VARCHAR), '/', 1) AS collection " +
        "FROM documents"),
    "f1_validation_filter" ->
      ("SELECT count(*) AS n_rows, " +
        "sum(CASE WHEN text IS NOT NULL AND length(text) > 0 THEN 1 ELSE 0 END) AS n_valid " +
        "FROM documents"),
    "a1_distinct" -> "SELECT DISTINCT lang FROM documents",
    "q_agg_group" ->
      ("SELECT lang, count(*) AS n_docs, sum(n_chars) AS total_chars, " +
        "min(doc_id) AS min_doc FROM documents GROUP BY lang"),
    "q_join_broadcast" ->
      ("SELECT c_mktsegment AS segment, count(*) AS n_orders, " +
        "round(sum(o_totalprice), 2) AS revenue " +
        "FROM orders JOIN customer ON o_custkey = c_custkey " +
        "GROUP BY c_mktsegment"),
    "q_join_sortmerge" ->
      ("SELECT o_orderpriority, count(*) AS n_lines, " +
        "round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue " +
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
        "GROUP BY o_orderpriority"),
    "q_window_topk" ->
      ("SELECT lang, doc_id, n_chars, rn FROM (" +
        "SELECT lang, doc_id, n_chars, " +
        "row_number() OVER (PARTITION BY lang ORDER BY n_chars DESC, doc_id ASC) AS rn " +
        "FROM documents) WHERE rn <= 3"),
    "q_sort_limit" ->
      ("SELECT doc_id, n_chars FROM documents " +
        "ORDER BY n_chars DESC, doc_id ASC LIMIT 10"),
    "q_set_ops" ->
      ("SELECT doc_id FROM documents WHERE lang = 'en' " +
        "EXCEPT SELECT doc_id FROM documents WHERE n_chars < 150"),
    "dedup_exact" ->
      ("SELECT min(doc_id) AS keep_id, count(*) AS n_copies " +
        "FROM documents GROUP BY text")
  )
}
