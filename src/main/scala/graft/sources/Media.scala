package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-level multimodal ingestion: directories of real WAV / MJPEG-AVI
  * files through Spark's `binaryFile` source into the container parsers
  * ([[graft.functions.RiffOps]]) — the loader shape a reference user brings
  * their media in with (srai's loaders read real format bytes from disk;
  * osm_tile_loader.py:97-138 treats blobs as true PNG files).
  *
  * Scale shape: `binaryFile` splits by file; each row is one container, and
  * every downstream extraction is a per-row codegen'd projection, so a
  * directory of 10⁹ media files parallelizes exactly like any file scan
  * (size-based packing via spark.sql.files.maxPartitionBytes). Corrupt
  * files fail loudly with offset-carrying parser messages; use the
  * `*_try`-style pre-filtering upstream if a corpus is known-dirty. */
object Media {

  /** (path, length, sample_rate, channels, pcm) for every `*.wav` under
    * `dir`. The RIFF chunk walk + PCM16 guard run per row. */
  def readWavDir(spark: SparkSession, dir: String): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.wav")
      .load(dir)
      .select(col("path"), col("length"),
        call_function("wav_sample_rate", col("content")).as("sample_rate"),
        call_function("wav_channels", col("content")).as("channels"),
        call_function("wav_pcm", col("content")).as("pcm"))

  /** Windowed RMS + zero-crossing features for every `*.wav` under `dir` —
    * the audio-quality filtering projection of a training-data pipeline. */
  def wavFeatures(spark: SparkSession, dir: String, window: Int = 256): DataFrame =
    readWavDir(spark, dir)
      .select(col("path"), col("sample_rate"), col("channels"),
        call_function("audio_zero_crossings", col("pcm")).as("zcr"),
        call_function("audio_rms_windows", col("pcm"), lit(window)).as("rms"))

  /** (path, w, h, n_frames, frame_idx, jpeg) — one row per frame of every
    * `*.avi` under `dir`; `jpeg` is the complete per-frame JPEG payload,
    * ready for the img_* decode surface. */
  def readAviFrames(spark: SparkSession, dir: String): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.avi")
      .load(dir)
      .select(col("path"),
        call_function("avi_width", col("content")).as("w"),
        call_function("avi_height", col("content")).as("h"),
        call_function("avi_frame_count", col("content")).as("n_frames"),
        posexplode(call_function("avi_frames", col("content"))))
      .select(col("path"), col("w"), col("h"), col("n_frames"),
        col("pos").cast("int").as("frame_idx"), col("col").as("jpeg"))
}
