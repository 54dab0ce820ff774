package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Gf

/** GTFS feed loader (reference: srai/loaders/gtfs_loader.py:60-193):
  * stop_times ⋈ trips ⋈ stops with the gtfs2vec aggregation —
  *  - `trips_at_{h}`: number of DISTINCT trips departing from the stop in
  *    hour h (reference `_load_trips` via gtfs_kit stop time series);
  *  - `directions_at_{h}`: set of distinct trip headsigns per stop and hour
  *    (reference `_load_directions` pivot with aggfunc=set) — emitted as a
  *    sorted comma-joined string so it is orderable and oracle-comparable;
  *  - geometry: stop point (stop_lon, stop_lat).
  *
  * GTFS departure_time is "HH:MM:SS" with HH possibly ≥ 24 (overnight
  * trips); hour = int(first two chars, ':' stripped) % 24 — exactly the
  * reference's `_parse_departure_time` (gtfs_loader.py:169-193).
  *
  * Spark shape: two broadcast-joined dimensions (trips, stops are small
  * next to stop_times), one hash aggregate keyed by stop_id with map-side
  * partials; the wide per-hour pivot is a fixed 24-column projection —
  * no `pivot()` call, so the plan is static and codegen-friendly.
  */
object Gtfs {

  /** Reference hour parse: first two chars, ':' stripped, % 24. */
  def departureHour(departureTime: Column): Column =
    (regexp_replace(substring(departureTime, 1, 2), ":", "").cast("int") % 24)

  def transform(stopTimes: DataFrame, trips: DataFrame, stops: DataFrame): DataFrame = {
    val joined = stopTimes
      .where(col("departure_time").isNotNull)
      .join(broadcast(trips.select("trip_id", "trip_headsign")), Seq("trip_id"))
      .withColumn("hour", departureHour(col("departure_time")))

    val hourAggs: Seq[Column] = (0 until 24).flatMap { h =>
      Seq(
        count_distinct(when(col("hour") === h, col("trip_id")))
          .cast("long").as(s"trips_at_$h"),
        concat_ws(",", sort_array(collect_set(
          when(col("hour") === h, col("trip_headsign")))))
          .as(s"directions_at_$h"))
    }
    val agg = joined.groupBy("stop_id")
      .agg(hourAggs.head, hourAggs.tail: _*)

    agg.join(broadcast(stops.select(col("stop_id"),
      Gf.stPoint(col("stop_lon"), col("stop_lat")).as(Tables.Geometry))),
      Seq("stop_id"), "left")
  }
}
