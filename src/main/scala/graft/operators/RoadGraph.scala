package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.Gf

/** Road-network graph frames (reference: srai/loaders/osm_way_loader —
  * L9: ways → (nodes_gdf, edges_gdf)). The OSM download is out of scope (no
  * egress); this is the graph-construction half: linestring features →
  * node/edge DataFrames with stable content-hashed node ids and per-edge
  * lengths — the input shape of Highway2Vec-style pipelines.
  *
  * Scale shape: endpoints are per-row projections; node ids are content
  * hashes of the endpoint WKB (no driver-side id assignment, no global
  * window); the node dedup is the only shuffle. */
object RoadGraph {

  /** (nodes, edges): nodes (node_id, lng, lat, geom);
    * edges (edge_id, u, v, length_deg, geom). */
  def fromWays(ways: DataFrame, idCol: String = Tables.FeaturesIndex)
  : (DataFrame, DataFrame) = {
    val g = col(Tables.Geometry)
    val withEnds = ways.select(
      col(idCol).as("edge_id"), g,
      Gf.stStartPoint(g).as("sp"), Gf.stEndPoint(g).as("ep"))
    val edges = withEnds.select(
      col("edge_id"),
      xxhash64(col("sp")).as("u"),
      xxhash64(col("ep")).as("v"),
      Gf.stLength(g).as("length_deg"),
      g)
    val nodes = withEnds.select(xxhash64(col("sp")).as("node_id"), col("sp").as("p"))
      .unionAll(withEnds.select(xxhash64(col("ep")), col("ep")))
      .dropDuplicates("node_id")
      .select(col("node_id"),
        Gf.stCentroidX(col("p")).as("lng"), Gf.stCentroidY(col("p")).as("lat"),
        col("p").as(Tables.Geometry))
    (nodes, edges)
  }
}
