package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.Gf

/** Neighbourhood operators as edge DataFrames (reference:
  * srai/neighbourhoods/_base.py — a neighbourhood is `index → Set[index]`
  * with hop-count distance; here it is an edge table reused across queries,
  * the distributed analogue of the reference's memoized lookup dict
  * (adjacency_neighbourhood.py:70-76 → `cache()` the edges).
  */
object Neighbourhoods {

  /** Adjacency edges: neighbours share any boundary point — `touches`
    * (reference: adjacency_neighbourhood.py:79-96). Distributed as a
    * cell-indexed spatial SELF-join: explode region covers, equi-join on
    * cell, refine `st_touches`, dedup. Output (region_id, neighbour_id),
    * symmetric. */
  def adjacencyEdges(regions: DataFrame, cellLevel: Int = 12): DataFrame = {
    val covered = regions.select(
      col(Tables.RegionsIndex), col(Tables.Geometry))
      .withColumn("cell", explode(Gf.s2Cover(col(Tables.Geometry), cellLevel)))
    val a = covered.select(col("cell"), col(Tables.RegionsIndex).as("region_id"),
      col(Tables.Geometry).as("g_a"))
    val b = covered.select(col("cell"), col(Tables.RegionsIndex).as("neighbour_id"),
      col(Tables.Geometry).as("g_b"))
    a.join(b, Seq("cell"))
      .where(col("region_id") =!= col("neighbour_id") &&
        Gf.stTouches(col("g_a"), col("g_b")))
      // project to ids BEFORE the dedup exchange — geometries must not ride
      // the pair shuffle
      .select("region_id", "neighbour_id")
      .dropDuplicates("region_id", "neighbour_id")
  }

  /** H3 k-ring closure (reference: srai/neighbourhoods/h3_neighbourhood.py
    * N1-N3): (region_id, neighbour_id, distance 1..k) from the closed-form
    * ring generator — a pure projection + explode, no joins. With
    * `unchecked=false`, neighbours are restricted to the available region
    * set (semi-join, reference :117-120). */
  def h3Closure(regions: DataFrame, k: Int, unchecked: Boolean = false): DataFrame = {
    val ids = regions.select(col(Tables.RegionsIndex))
    // ONE BFS per region for the whole disk (per-ring generators re-ran
    // every inner disk k times and scanned regions k times via unionAll)
    val rings = ids.select(
      col(Tables.RegionsIndex).as("region_id"),
      explode(Gf.h3GridDiskDistances(
        Gf.h3FromStr(col(Tables.RegionsIndex)), k)).as("nd"))
      .where(col("nd.distance") >= 1)
      .select(col("region_id"), Gf.h3Str(col("nd.cell")).as("neighbour_id"),
        col("nd.distance").as("distance"))
    if (unchecked) rings
    else rings.join(
      ids.select(col(Tables.RegionsIndex).as("neighbour_id")),
      Seq("neighbour_id"), "left_semi")
      .select("region_id", "neighbour_id", "distance")
  }

  /** k-ring buffer of a cell set (reference: srai/h3.py:209-226
    * ring_buffer_h3_indexes — disk union, dedup). */
  def h3RingBuffer(regions: DataFrame, k: Int): DataFrame =
    regions.select(
      explode(Gf.h3GridDisk(Gf.h3FromStr(col(Tables.RegionsIndex)), k)).as("cell"))
      .dropDuplicates("cell")
      .select(Gf.h3Str(col("cell")).as(Tables.RegionsIndex))

  /** Buffered bounding geometry of a cell set (reference: srai/h3.py:229-263
    * `ring_buffer_geometry`): k-ring buffer the cells, then dissolve the hex
    * boundaries into ONE geometry with the distributed union aggregate
    * (map-side partial unions — no driver-side geometry loop). */
  def h3RingBufferGeometry(regions: DataFrame, k: Int): DataFrame =
    h3RingBuffer(regions, k)
      .select(Gf.h3Boundary(Gf.h3FromStr(col(Tables.RegionsIndex))).as("g"))
      .agg(Gf.stUnionAgg(col("g")).as(Tables.Geometry))

  /** Geometry-input variant (reference signature: geometry + resolution +
    * distance): cover with H3 (intersects mode, srai's buffer=True), then
    * buffer + dissolve. */
  def ringBufferGeometry(areas: DataFrame, resolution: Int, k: Int): DataFrame =
    h3RingBufferGeometry(
      areas.select(explode(Gf.h3Cover(col(Tables.Geometry), resolution)).as("c"))
        .select(Gf.h3Str(col("c")).as(Tables.RegionsIndex))
        .dropDuplicates(Tables.RegionsIndex), k)

  /** Hop-distance closure up to `k` over an edge table: (region_id,
    * neighbour_id, distance) with the MINIMUM hop distance, distances
    * 1..k, self excluded. BFS = k rounds of frontier⋈edges (Pregel-lite,
    * reference N5 `_get_neighbours_with_distances` _base.py:118-137);
    * k is small, the loop runs on the driver, the data never leaves Spark. */
  def distanceClosure(edges: DataFrame, k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    // per-hop localCheckpoint: frontier_d references frontier_(d-1) AND
    // result_(d-1), so the lazy plan would double per hop; eager
    // checkpointing bounds the plan and the blocks free themselves when
    // the result is unreachable (a cache() here leaked one pinned copy of
    // the edges per call — review finding, round 3)
    val e = edges.select(col("region_id"), col("neighbour_id"))
      .localCheckpoint(true)
    var result = e.withColumn("distance", lit(1))
    var frontier = result
    for (d <- 2 to k) {
      // extend the frontier one hop; drop anything already reached
      frontier = frontier.select(col("region_id"), col("neighbour_id").as("mid"))
        .join(e.select(col("region_id").as("mid"), col("neighbour_id")), Seq("mid"))
        .where(col("region_id") =!= col("neighbour_id"))
        .select("region_id", "neighbour_id").distinct()
        .join(result.select("region_id", "neighbour_id"),
          Seq("region_id", "neighbour_id"), "left_anti")
        .withColumn("distance", lit(d))
        .localCheckpoint(true)
      result = result.unionAll(frontier)
    }
    result
  }

  /** srai center-handling semantics (_base.py:139-167): neighbours up to
    * distance k from `seeds`, include_center adds (seed, seed, 0). */
  def neighboursUpToDistance(closure: DataFrame, seeds: DataFrame, k: Int,
                             includeCenter: Boolean): DataFrame = {
    val base = seeds.select(col(Tables.RegionsIndex).as("region_id"))
      .join(closure.where(col("distance") <= k), Seq("region_id"))
    if (includeCenter)
      base.unionAll(seeds.select(col(Tables.RegionsIndex).as("region_id"),
        col(Tables.RegionsIndex).as("neighbour_id"), lit(0).as("distance")))
    else base
  }

  /** Neighbours at exactly distance k (hollow ring); center only when k=0
    * and include_center (reference N3/N4 matrix). */
  def neighboursAtDistance(closure: DataFrame, seeds: DataFrame, k: Int,
                           includeCenter: Boolean): DataFrame = {
    if (k == 0) {
      val centers = seeds.select(col(Tables.RegionsIndex).as("region_id"),
        col(Tables.RegionsIndex).as("neighbour_id"), lit(0).as("distance"))
      // empty frame with the SAME derived schema — no hand-built literals
      if (includeCenter) centers else centers.where(lit(false))
    } else
      seeds.select(col(Tables.RegionsIndex).as("region_id"))
        .join(closure.where(col("distance") === k), Seq("region_id"))
  }
}
