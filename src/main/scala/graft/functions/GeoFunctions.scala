package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Geo scalar functions (SURVEY.md §2 C14).
  *
  * The reference's AIS topic carries vessel positions as (lat, lon) doubles
  * plus a combined "lat,lon" string (reference:
  * `sample-data/classAPositionReportSchema.json:32-46`); distance math over
  * them is the natural query. Built purely from codegen'd Spark built-ins —
  * stays inside WholeStageCodegen, no UDF boundary.
  */
object GeoFunctions {

  val EarthRadiusMeters = 6371000.0

  /** Great-circle distance in meters between two (lat, lon) pairs, degrees in. */
  def haversineMeters(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column = {
    val dLat = radians(lat2 - lat1) / 2
    val dLon = radians(lon2 - lon1) / 2
    val a = pow(sin(dLat), 2) +
      cos(radians(lat1)) * cos(radians(lat2)) * pow(sin(dLon), 2)
    lit(2 * EarthRadiusMeters) * asin(sqrt(a))
  }

  /** Parse the reference's combined "lat,lon" string into a (lat, lon) struct. */
  def parseLatLon(s: Column): Column = {
    val parts = split(s, ",")
    struct(
      parts.getItem(0).cast("double").as("lat"),
      parts.getItem(1).cast("double").as("lon"))
  }
}
