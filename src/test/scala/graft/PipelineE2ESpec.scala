package graft

import java.io.File
import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.tpg._

/** Whole-pipeline integration: raw CSVs → partitioned silver parquet →
  * features gold → stop×line aggregate → training rows, including the
  * idempotent-re-run (upsert) property end-to-end.
  */
class PipelineE2ESpec extends SparkSpec {

  private def writeTemp(name: String, content: String): String = {
    val f = File.createTempFile(name, ".csv")
    f.deleteOnExit()
    Files.writeString(f.toPath, content)
    f.getAbsolutePath
  }

  private val weatherCsv =
    """station_abbr;reference_timestamp;tre200s0;rre150z0;fu3010z0;fu3010z1;dkl010z0;ure200s0;prestas0;gre000z0;sre000z0;tde200s0
      |GVE;01.06.2024 10:00;20.0;0.0;10.8;18.0;180;55;1013.2;350;10;12.0
      |GVE;01.06.2024 10:10;19.5;1.2;7.2;10.8;170;60;1012.8;300;8;11.8
      |GVE;01.06.2024 10:20;19.0;2.5;7.2;10.8;170;62;1012.5;280;6;11.6""".stripMargin

  private val istCsv =
    """BETRIEBSTAG;FAHRT_BEZEICHNER;BETREIBER_ABK;PRODUKT_ID;LINIEN_TEXT;HALTESTELLEN_NAME;BPUIC;ANKUNFTSZEIT;AN_PROGNOSE;AN_PROGNOSE_STATUS;ABFAHRTSZEIT;AB_PROGNOSE;AB_PROGNOSE_STATUS;DURCHFAHRT_TF;ZUSATZFAHRT_TF;FAELLT_AUS_TF
      |01.06.2024;85:889:1;TPG;Bus;12;Bel-Air;8587057;;;;01.06.2024 10:04:00;01.06.2024 10:06:00;REAL;0;0;0
      |01.06.2024;85:889:2;TPG;Bus;12;Bel-Air;8587057;;;;01.06.2024 10:05:00;01.06.2024 10:08:00;REAL;0;0;0
      |01.06.2024;85:889:3;TPG;Tram;14;Stand;8587058;;;;01.06.2024 10:15:00;01.06.2024 10:16:00;REAL;0;0;0""".stripMargin

  test("raw CSV → silver → features → stop-line agg → training rows") {
    val dir = Files.createTempDirectory("e2e_").toFile.getAbsolutePath

    // silver ingests with partitioned writes
    WeatherIngest.write(
      WeatherIngest.ingest(spark, Seq(writeTemp("wx0", weatherCsv))), s"$dir/weather")
    IstdatenIngest.write(
      IstdatenIngest.ingest(spark, Seq(writeTemp("ix0", istCsv))), s"$dir/ist")

    val weather = spark.read.parquet(s"$dir/weather")
    val ist = spark.read.parquet(s"$dir/ist")
    assert(weather.count() == 3 && ist.count() == 3)
    assert(ist.columns.contains("ym")) // hive-partitioned month key

    // re-run same batch: dynamic partition overwrite → identical state (S10)
    IstdatenIngest.write(
      IstdatenIngest.ingest(spark, Seq(writeTemp("ix2", istCsv))), s"$dir/ist")
    val istRerun = spark.read.parquet(s"$dir/ist") // fresh listing post-overwrite
    assert(istRerun.count() == 3)

    // gold: features with strict weather join
    val feats = FeaturesEvents.build(istRerun, weather, FeaturesEvents.DominantStation)
    FeaturesEvents.write(feats, s"$dir/features")
    val f = spark.read.parquet(s"$dir/features")
    assert(f.count() == 3)
    // bin 10:00 events joined to 10:00 weather obs
    assert(f.filter(col("fahrt_bezeichner") === "85:889:1")
      .collect()(0).getAs[Double]("temp_c") == 20.0)

    // gold, AS-OF flavor: bucketed station-keyed join end-to-end through parquet
    val featsAsof = FeaturesEvents.build(istRerun, weather,
      FeaturesEvents.DominantStation, asof = true)
    FeaturesEvents.write(featsAsof, s"$dir/features_asof")
    val fa = spark.read.parquet(s"$dir/features_asof")
    assert(fa.count() == 3)
    // Stand event bin 10:10 → latest obs ≤ 10:10 is the 10:10 reading (fresh)
    assert(fa.filter(col("fahrt_bezeichner") === "85:889:3")
      .collect()(0).getAs[Double]("temp_c") == 19.5)

    // stop×line aggregate
    val agg = FeaturesByStopLine.build(f)
    assert(agg.count() == 2) // (12, Bel-Air, 10:00) ×2 trips + (14, Stand, 10:10)
    val belAir = agg.filter(col("stop_key") === "12·8587057").collect()(0)
    assert(belAir.getAs[Long]("n_trips") == 2L)
    assert(belAir.getAs[Double]("delay_p50_min") == 2.5) // delays 2 and 3 min

    // training rows with weather lags
    val rows = TrainingRow.build(f, weather)
    assert(rows.count() == 3)
    val stand = rows.filter(col("fahrt_bezeichner") === "85:889:3").collect()(0)
    // Stand event bin = 10:10 → lag10 = obs at 10:00, lag20 = (no 09:50 obs)
    assert(stand.getAs[Double]("rain_mm_lag10") == 0.0)
    assert(stand.isNullAt(stand.fieldIndex("rain_mm_lag20")))
  }
}
