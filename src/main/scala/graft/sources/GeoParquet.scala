package graft.sources

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.{DataFrame, SparkSession}

/** GeoParquet-aware reader (L1; reference:
  * srai/loaders/geoparquet_loader.py:27-68 loads GeoParquet and reprojects
  * everything to WGS84). The engine's convention is WGS84-only, so instead
  * of reprojecting, reads ASSERT the file's CRS: if the parquet footer
  * carries the GeoParquet `geo` key, every geometry column must declare
  * EPSG:4326 / OGC:CRS84 (or no CRS — the spec default is CRS84), otherwise
  * the read fails loudly. A mis-CRS'd input would otherwise silently join
  * garbage cells. Plain parquet without the `geo` key is accepted by the
  * documented WGS84-by-convention stance.
  *
  * Cost: one footer read of one data file per table open — metadata only,
  * independent of table size. */
object GeoParquet {

  def read(spark: SparkSession, path: String): DataFrame = {
    assertWgs84(spark, path)
    spark.read.parquet(path)
  }

  /** Footer-level CRS assert on the first data file under `path`. */
  def assertWgs84(spark: SparkSession, path: String): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val status = fs.getFileStatus(p)
    var file: Path = null
    if (status.isFile) file = p
    else {
      val it = fs.listFiles(p, true)
      while (file == null && it.hasNext) {
        val f = it.next().getPath
        if (f.getName.endsWith(".parquet") && !f.getName.startsWith("_") &&
          !f.getName.startsWith(".")) file = f
      }
    }
    if (file == null) return // empty dir: nothing to validate
    val reader = ParquetFileReader.open(HadoopInputFile.fromPath(file, conf))
    val geo =
      try reader.getFooter.getFileMetaData.getKeyValueMetaData.get("geo")
      finally reader.close()
    if (geo != null) validateGeoMeta(geo, file.toString)
  }

  /** Validate a GeoParquet `geo` metadata JSON document: every declared
    * geometry column's CRS must be WGS84 (EPSG:4326 / OGC:CRS84) or absent
    * (the GeoParquet spec default, OGC:CRS84). */
  private[graft] def validateGeoMeta(json: String, source: String = "<meta>"): Unit = {
    val root = new ObjectMapper().readTree(json)
    val cols = root.path("columns")
    if (cols.isMissingNode) return
    val names = cols.fieldNames()
    while (names.hasNext) {
      val name = names.next()
      val crs = cols.path(name).path("crs")
      if (!crs.isMissingNode && !crs.isNull) {
        val id = crs.path("id")
        val auth = id.path("authority").asText("")
        val code = id.path("code").asText("")
        val ok = (auth == "OGC" && code == "CRS84") ||
          (auth == "EPSG" && code == "4326")
        require(ok, s"GeoParquet column '$name' in $source declares CRS " +
          s"$auth:$code — this engine is WGS84-only (EPSG:4326 / OGC:CRS84); " +
          "reproject before loading (reference geoparquet_loader.py:52-60 " +
          "calls to_crs(WGS84))")
      }
    }
  }
}
