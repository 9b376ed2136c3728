package graft.graphx

import org.apache.spark.graphx.{Edge, Graph => XGraph, VertexId}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Whole-graph analytics over the edges view — the reference lists
  * PageRank / map-reduce as its plugin end-goals (reference:
  * README.md:55-57) but ships no implementation; GraphX provides both
  * as fixed-point Pregel programs.
  *
  * Vertex ids: GraphX needs Long ids; string node ids map through
  * xxhash64 (collision odds at 64 bits are negligible below ~10^9
  * nodes; the id→hash mapping rides along and joins back at the end,
  * so results always carry the original string id).
  */
object GraphAnalytics {

  /** Build a GraphX graph from an edges DataFrame [src_id, label, dst_id]. */
  def build(edges: DataFrame): (XGraph[String, String], DataFrame) = {
    val spark = edges.sparkSession
    val verts = edges.select(col("src_id").as("id"))
      .unionAll(edges.select(col("dst_id").as("id")))
      .distinct()
      .select(col("id"), xxhash64(col("id")).as("vid"))
    val vertRdd = verts.select("vid", "id").rdd
      .map(r => (r.getLong(0): VertexId, r.getString(1)))
    val edgeRdd = edges
      .select(xxhash64(col("src_id")).as("s"), xxhash64(col("dst_id")).as("d"),
        col("label"))
      .rdd.map(r => Edge(r.getLong(0), r.getLong(1), r.getString(2)))
    (XGraph(vertRdd, edgeRdd), verts)
  }

  /** PageRank to `tol` fixed-point; returns [id, rank]. */
  def pageRank(edges: DataFrame, tol: Double = 1e-4): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val (g, verts) = build(edges)
    val ranks = g.pageRank(tol).vertices.toDF("vid", "rank")
    ranks.join(verts, "vid").select("id", "rank")
  }

  /** Connected components (undirected); returns [id, component] with
    * component = min xxhash64 in the component, remapped to the
    * lexicographically-smallest member id for stability. */
  def connectedComponents(edges: DataFrame): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val (g, verts) = build(edges)
    val cc = g.connectedComponents().vertices.toDF("vid", "cvid")
    val withId = cc.join(verts, "vid").select("id", "cvid")
    val label = withId.groupBy("cvid").agg(min("id").as("component"))
    withId.join(label, "cvid").select("id", "component")
  }
}
