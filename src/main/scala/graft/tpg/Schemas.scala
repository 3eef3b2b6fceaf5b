package graft.tpg

import org.apache.spark.sql.types._

/** Warehouse table schemas — the engine's typed equivalent of the reference
  * DDL (`src/common.py:93-194`). Spark columns are nullable by default,
  * matching the reference's nullable pandas/DuckDB columns; business keys
  * are enforced by the dedupe operators, not constraints (as in the
  * reference).
  */
object Schemas {

  /** gtfs_stops ≙ common.py:95-105 */
  val gtfsStops: StructType = StructType(Seq(
    StructField("stop_id", StringType),
    StructField("stop_name", StringType),
    StructField("lat", DoubleType),
    StructField("lon", DoubleType),
    StructField("location_type", StringType),
    StructField("parent_station", StringType),
    StructField("platform_code", StringType),
    StructField("zone_id", StringType),
    StructField("feed_version", StringType)))

  /** gtfs_routes ≙ common.py:106-113 */
  val gtfsRoutes: StructType = StructType(Seq(
    StructField("route_id", StringType),
    StructField("route_short_name", StringType),
    StructField("route_long_name", StringType),
    StructField("route_type", StringType),
    StructField("agency_id", StringType),
    StructField("operator_name", StringType),
    StructField("feed_version", StringType)))

  /** gtfs_trips ≙ common.py:114-121 */
  val gtfsTrips: StructType = StructType(Seq(
    StructField("trip_id", StringType),
    StructField("route_id", StringType),
    StructField("service_id", StringType),
    StructField("direction_id", StringType),
    StructField("trip_headsign", StringType),
    StructField("feed_version", StringType)))

  /** gtfs_stop_times ≙ common.py:122-130 — planned times stay TEXT because
    * GTFS allows hour overflow ("25:10:00").
    */
  val gtfsStopTimes: StructType = StructType(Seq(
    StructField("trip_id", StringType),
    StructField("stop_sequence", IntegerType),
    StructField("stop_id", StringType),
    StructField("arrival_time_planned", StringType),
    StructField("departure_time_planned", StringType),
    StructField("feed_version", StringType)))

  /** ist_events ≙ common.py:133-151 */
  val istEvents: StructType = StructType(Seq(
    StructField("service_date", DateType),
    StructField("fahrt_bezeichner", StringType),
    StructField("operator_abbr", StringType),
    StructField("product_id", StringType),
    StructField("line_text", StringType),
    StructField("stop_name", StringType),
    StructField("stop_code", StringType),
    StructField("arrival_time_sched", TimestampType),
    StructField("arrival_time_est", TimestampType),
    StructField("arrival_status", StringType),
    StructField("depart_time_sched", TimestampType),
    StructField("depart_time_est", TimestampType),
    StructField("depart_status", StringType),
    StructField("is_pass_through", BooleanType),
    StructField("is_additional", BooleanType),
    StructField("is_cancelled", BooleanType)))

  /** weather_obs ≙ common.py:157-171 — 10-minute grid, PK (station_id, ts_utc). */
  val weatherObs: StructType = StructType(Seq(
    StructField("station_id", StringType),
    StructField("ts_utc", TimestampType),
    StructField("temp_c", DoubleType),
    StructField("rain_mm", DoubleType),
    StructField("wind_ms", DoubleType),
    StructField("gust_ms", DoubleType),
    StructField("wind_dir_deg", DoubleType),
    StructField("rel_humidity", DoubleType),
    StructField("pressure_hpa", DoubleType),
    StructField("global_rad_wm2", DoubleType),
    StructField("sunshine_min", DoubleType),
    StructField("dewpoint_c", DoubleType)))

  /** IstDaten raw→normalized column map ≙ 02:45-62 (German → English). */
  val istdatenRenames: Seq[(String, String)] = Seq(
    "BETRIEBSTAG" -> "service_date",
    "FAHRT_BEZEICHNER" -> "fahrt_bezeichner",
    "BETREIBER_ABK" -> "operator_abbr",
    "PRODUKT_ID" -> "product_id",
    "LINIEN_TEXT" -> "line_text",
    "HALTESTELLEN_NAME" -> "stop_name",
    "BPUIC" -> "stop_code",
    "ANKUNFTSZEIT" -> "arrival_time_sched",
    "AN_PROGNOSE" -> "arrival_time_est",
    "AN_PROGNOSE_STATUS" -> "arrival_status",
    "ABFAHRTSZEIT" -> "depart_time_sched",
    "AB_PROGNOSE" -> "depart_time_est",
    "AB_PROGNOSE_STATUS" -> "depart_status",
    "DURCHFAHRT_TF" -> "is_pass_through",
    "ZUSATZFAHRT_TF" -> "is_additional",
    "FAELLT_AUS_TF" -> "is_cancelled")

  /** MeteoSwiss parameter-code → measure name map ≙ 03:36-49. */
  val weatherRenames: Seq[(String, String)] = Seq(
    "station_abbr" -> "station_id",
    "reference_timestamp" -> "ts_utc",
    "tre200s0" -> "temp_c",
    "rre150z0" -> "rain_mm",
    "fu3010z0" -> "wind_kmh",
    "fu3010z1" -> "gust_kmh",
    "dkl010z0" -> "wind_dir_deg",
    "ure200s0" -> "rel_humidity",
    "prestas0" -> "pressure_hpa",
    "gre000z0" -> "global_rad_wm2",
    "sre000z0" -> "sunshine_min",
    "tde200s0" -> "dewpoint_c")
}
