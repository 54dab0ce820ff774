package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Gtfs

/** GTFS service-calendar semantics (reference gtfs_loader.py:103-106
  * aggregates the feed's FIRST WEDNESDAY via gtfs_kit, which restricts
  * trips to services active on that date: weekday flag + date range +
  * calendar_dates exceptions). */
class GtfsCalendarSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  // feed starts Wed 2024-01-03 → first full week starts Mon 01-08 →
  // aggregation date = Wed 2024-01-10
  private lazy val calendar = Seq(
    // service_id, mon..sun, start, end
    ("svc_wd", 1, 1, 1, 1, 1, 0, 0, "20240103", "20241231"),
    ("svc_we", 0, 0, 0, 0, 0, 1, 1, "20240103", "20241231"),
    ("svc_gone", 0, 0, 1, 0, 0, 0, 0, "20240103", "20240105"))
    .toDF("service_id", "monday", "tuesday", "wednesday", "thursday",
      "friday", "saturday", "sunday", "start_date", "end_date")

  private lazy val exceptions = Seq(
    ("svc_we", "20240110", 1), // added for the aggregation day
    ("svc_wd", "20240110", 2)) // removed for the aggregation day
    .toDF("service_id", "date", "exception_type")

  private lazy val trips = Seq(
    ("t1", "svc_wd", "Centre"), ("t2", "svc_we", "Airport"),
    ("t3", "svc_gone", "Depot"))
    .toDF("trip_id", "service_id", "trip_headsign")

  private lazy val stopTimes = Seq(
    ("t1", "s1", "08:10:00"), ("t2", "s1", "08:20:00"), ("t3", "s1", "08:30:00"))
    .toDF("trip_id", "stop_id", "departure_time")

  private lazy val stops =
    Seq(("s1", 52.0, 21.0)).toDF("stop_id", "stop_lat", "stop_lon")

  test("first Wednesday aligns the feed start forward to Monday + 2 days") {
    assert(Gtfs.firstWednesday(calendar) === "20240110")
    // a pre-season added-service exception can start the feed EARLIER than
    // any calendar range (gtfs_kit get_dates spans all service dates):
    // 2023-12-27 is a Wednesday → next Monday 2024-01-01 → Wed 2024-01-03
    val early = Seq(("svc_x", "20231227", 1))
      .toDF("service_id", "date", "exception_type")
    assert(Gtfs.firstWednesday(calendar, Some(early)) === "20240103")
    // no service dates anywhere → clear error
    intercept[IllegalArgumentException](
      Gtfs.firstWednesday(calendar.limit(0), None))
  }

  test("active services: weekday flag + date range + add/remove exceptions") {
    // plain Wednesday flag would keep svc_wd and svc_gone-by-flag; the date
    // range kills svc_gone, the exceptions remove svc_wd and add svc_we
    val active = Gtfs.activeServices(calendar, Some(exceptions), "20240110")
      .as[String].collect().toSet
    assert(active === Set("svc_we"))
    // without exceptions: range + weekday flags only
    val plain = Gtfs.activeServices(calendar, None, "20240110")
      .as[String].collect().toSet
    assert(plain === Set("svc_wd"))
  }

  test("transform with a calendar keeps only trips active on the first Wednesday") {
    val out = Gtfs.transform(stopTimes, trips, stops,
      calendar = Some(calendar), calendarDates = Some(exceptions)).collect()
    assert(out.length === 1)
    val r = out(0)
    assert(r.getAs[String]("stop_id") === "s1")
    assert(r.getAs[Long]("trips_at_8") === 1L) // only t2 (svc_we, added)
    assert(r.getAs[String]("directions_at_8") === "Airport")
    assert(r.getAs[Long]("trips_at_9") === 0L)

    // no calendar → all trips count (the q32 path, unchanged)
    val all = Gtfs.transform(stopTimes, trips, stops).collect()(0)
    assert(all.getAs[Long]("trips_at_8") === 3L)
  }

  test("a type-2 (removed) exception predating every calendar range still " +
       "shifts the feed's first Wednesday (gtfs_kit get_dates parity)") {
    // 2023-12-20 is a Wednesday; exception_type 2 — gtfs_kit still counts
    // the date, so first week starts Mon 2023-12-25 → Wed 2023-12-27
    val removedEarly = Seq(("svc_x", "20231220", 2))
      .toDF("service_id", "date", "exception_type")
    assert(Gtfs.firstWednesday(calendar, Some(removedEarly)) === "20231227")
  }

  test("countVisits: a trip looping a stop twice in one hour counts twice") {
    // t1 visits s1 at 08:10 and again 08:40 (a loop route); t2 once
    val looped = Seq(
      ("t1", "s1", "08:10:00"), ("t1", "s1", "08:40:00"),
      ("t2", "s1", "08:20:00"))
      .toDF("trip_id", "stop_id", "departure_time")
    val distinctMode = Gtfs.transform(looped, trips, stops).collect()(0)
    assert(distinctMode.getAs[Long]("trips_at_8") === 2L) // t1, t2 distinct
    val visitMode = Gtfs.transform(looped, trips, stops,
      countVisits = true).collect()(0)
    assert(visitMode.getAs[Long]("trips_at_8") === 3L) // 3 stop_times rows
    // headsign sets are unaffected by the counting mode
    assert(visitMode.getAs[String]("directions_at_8") ===
      distinctMode.getAs[String]("directions_at_8"))
  }
}
