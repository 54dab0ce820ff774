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
    * `dir`. ONE RIFF parse per file (the struct-returning `wav_decode`) —
    * three scalar accessors would each re-walk the chunks and copy the
    * whole data payload. */
  def readWavDir(spark: SparkSession, dir: String): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.wav")
      .load(dir)
      .select(col("path"), col("length"),
        call_function("wav_decode", col("content")).as("w"))
      .select(col("path"), col("length"),
        col("w.sample_rate").as("sample_rate"),
        col("w.channels").as("channels"), col("w.pcm").as("pcm"))

  /** Windowed RMS + zero-crossing features for every `*.wav` under `dir` —
    * the audio-quality filtering projection of a training-data pipeline. */
  def wavFeatures(spark: SparkSession, dir: String, window: Int = 256): DataFrame =
    readWavDir(spark, dir)
      .select(col("path"), col("sample_rate"), col("channels"),
        call_function("audio_zero_crossings", col("pcm")).as("zcr"),
        call_function("audio_rms_windows", col("pcm"), lit(window)).as("rms"))

  /** (path, w, h, n_frames, frame_idx, jpeg) — one row per frame of every
    * `*.avi` under `dir`; `jpeg` is the complete per-frame JPEG payload,
    * ready for the img_* decode surface. One header parse per file
    * (struct-returning `avi_header`), and zero-frame files KEEP their
    * file-level row (outer explode: frame_idx/jpeg null) so directory
    * inventories never undercount. */
  def readAviFrames(spark: SparkSession, dir: String): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.avi")
      .load(dir)
      .select(col("path"), call_function("avi_header", col("content")).as("hd"),
        call_function("avi_frames", col("content")).as("frames"))
      .select(col("path"), col("hd.w").as("w"), col("hd.h").as("h"),
        col("hd.n_frames").as("n_frames"), posexplode_outer(col("frames")))
      .select(col("path"), col("w"), col("h"), col("n_frames"),
        col("pos").cast("int").as("frame_idx"), col("col").as("jpeg"))
}
