package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
    * edges (edge_id, u, v, length_deg, geom).
    *
    * Node identity is a 128-bit content hash of the endpoint WKB (md5 hex):
    * at planetary endpoint counts (~10⁹) a 64-bit id has ~n²/2⁶⁵ expected
    * birthday collisions — a couple of silently merged intersections — while
    * 128 bits push that below 10⁻²⁰. */
  def fromWays(ways: DataFrame, idCol: String = Tables.FeaturesIndex)
  : (DataFrame, DataFrame) = {
    val g = col(Tables.Geometry)
    def nodeId(p: org.apache.spark.sql.Column) = md5(p)
    val withEnds = ways.select(
      col(idCol).as("edge_id"), g,
      Gf.stStartPoint(g).as("sp"), Gf.stEndPoint(g).as("ep"))
    val edges = withEnds.select(
      col("edge_id"),
      nodeId(col("sp")).as("u"),
      nodeId(col("ep")).as("v"),
      Gf.stLength(g).as("length_deg"),
      g)
    val nodes = withEnds.select(nodeId(col("sp")).as("node_id"), col("sp").as("p"))
      .unionAll(withEnds.select(nodeId(col("ep")), col("ep")))
      .dropDuplicates("node_id")
      .select(col("node_id"),
        Gf.stCentroidX(col("p")).as("lng"), Gf.stCentroidY(col("p")).as("lat"),
        col("p").as(Tables.Geometry))
    (nodes, edges)
  }
}

/** OSM way-attribute sanitization + normalization (reference:
  * srai/loaders/osm_way_loader/osm_way_loader.py:304-374
  * `_sanitize`/`_normalize`) as pure column expressions — per-row string /
  * numeric logic inside whole-stage codegen, no UDFs.
  *
  * Semantics mirrored exactly:
  *  - empty/"none"/"None"/"nan"/"NaN"/null → "None";
  *  - lanes: int(float(x)) clipped to 15;
  *  - maxspeed: "signals"/"variable" → None; implicit zone table
  *    ([[ImplicitMaxspeeds]]); "km/h" stripped; "N mph" → N×1.609344;
  *    buckets 0/5/7/10/15 then round-half-even to tens capped at 200;
  *  - width: "Nm"/"N meter" stripped; "N'" → N×0.0254 (the reference uses
  *    the inches factor for the foot symbol — mirrored verbatim);
  *    "N ft" → N×0.3048; round-half-even to halves capped at 30.0;
  *  - any unparsable value → "None" (reference catches and returns 'None').
  *
  * Rounding is HALF_EVEN (`bround`) to match python's banker's `round`. */
object WayNormalizer {

  private val missing = Seq("", "none", "None", "nan", "NaN")

  private def cleaned(c: Column): Column =
    when(c.isNull || c.isin(missing: _*), lit(null)).otherwise(trim(c))

  /** lanes → "0".."15" or "None". */
  def lanes(c: Column): Column = {
    val v = cleaned(c).try_cast("double").try_cast("int")
    // least()/greatest() skip nulls — guard so null stays null → "None"
    coalesce(when(v.isNotNull, least(v, lit(15))).cast("string"), lit("None"))
  }

  /** maxspeed → bucketed km/h string or "None". */
  def maxspeed(c: Column): Column = {
    val raw0 = cleaned(c)
    val raw = when(raw0.isin("signals", "variable"), lit(null)).otherwise(raw0)
    val mapped = coalesce(
      element_at(typedlit(ImplicitMaxspeeds.table), raw), raw)
    val noKmh = regexp_replace(mapped, "km/h", "")
    val v = when(noKmh.contains("mph"),
      trim(regexp_replace(noKmh, "mph.*$", "")).try_cast("double") * 1.609344)
      .otherwise(trim(noKmh).try_cast("double"))
    val bucketed = when(v <= 0, lit(0.0))
      .when(v <= 5, lit(5.0)).when(v <= 7, lit(7.0))
      .when(v <= 10, lit(10.0)).when(v <= 15, lit(15.0))
      .when(v.isNotNull, least(bround(v / 10, 0) * 10, lit(200.0)))
    coalesce(bucketed.cast("int").cast("string"), lit("None"))
  }

  /** width → half-meter-rounded string (python float repr) or "None". */
  def width(c: Column): Column = {
    val raw = cleaned(c)
    val v = when(raw.rlike("(m|meter)$"),
      trim(regexp_replace(raw, "m.*$", "")).try_cast("double"))
      .when(raw.contains("'"),
        trim(regexp_replace(raw, "'.*$", "")).try_cast("double") * 0.0254)
      .when(raw.rlike("ft$"),
        trim(regexp_replace(raw, "ft$", "")).try_cast("double") * 0.3048)
      .otherwise(raw.try_cast("double"))
    coalesce(when(v.isNotNull, least(bround(v * 2, 0) / 2, lit(30.0)))
      .cast("string"), lit("None"))
  }

  /** Generic categorical column: trimmed value or "None" (reference:
    * str(x) with None → 'None'). */
  def categorical(c: Column): Column = coalesce(cleaned(c), lit("None"))

  /** Normalize a whole edge frame: known numeric keys get their dedicated
    * rules, every other requested key is categorical. */
  def normalize(edges: DataFrame, keys: Seq[String]): DataFrame = {
    val projected = keys.map {
      case "lanes" => lanes(col("lanes")).as("lanes")
      case "maxspeed" => maxspeed(col("maxspeed")).as("maxspeed")
      case "width" => width(col("width")).as("width")
      case k => categorical(col(k)).as(k)
    }
    val others = edges.columns.filterNot(keys.contains).map(col).toSeq
    edges.select(others ++ projected: _*)
  }
}
