package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Structured-Streaming forms of the engine's stateless/windowed operators.
  *
  * The reference has no streaming (SURVEY.md §2.8); tile assignment is a
  * stateless per-row projection so it ports to readStream unchanged, and the
  * hourly analytics become a watermarked windowed aggregate. These exist to
  * prove the operators compose with `readStream` — the batch path remains
  * the primary engine.
  */
object Streams {

  def eventsSchema: StructType = new StructType()
    .add("event_id", "long").add("ts", "timestamp")
    .add("user_id", "long").add("event_type", "string")
    .add("value", "double").add("props", "string")

  /** File-stream over an events directory. */
  def readEvents(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(eventsSchema).parquet(dir)

  /** Watermarked tumbling-window counts per event type (streaming form of
    * q08_events_hourly). */
  def hourlyCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("total_value"))
      .select(col("window.start").as("hour"), col("event_type"),
        col("n"), col("total_value"))

  /** Streaming tile assignment: stateless projection of user geotags derived
    * from user_id (same modular scheme as the batch DerivedGeo), counted per
    * slippy tile per window. */
  def tileCounts(events: DataFrame, zoom: Int): DataFrame = {
    val lng = (col("user_id") % 3600) / 10.0 - 180.0 + 0.05
    val lat = ((col("user_id") * 7) % 1200) / 10.0 - 60.0 + 0.05
    events
      .withColumn("tile_id", concat_ws("_",
        graft.sources.DerivedGeo.tileX(lng, zoom).cast("string"),
        graft.sources.DerivedGeo.tileY(lat, zoom).cast("string"),
        lit(zoom.toString)))
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("tile_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("hour"), col("tile_id"), col("n"))
  }
}
