package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Macros
import graft.operators.{Asof, Dedupe, Merge, Profile}

/** One named query per operator family in SURVEY.md §2, paired with an
  * ANSI-SQL oracle the driver runs in DuckDB over the same parquet tables.
  *
  * Conventions (driver compare = sort columns by name, hash values):
  *  - every aggregate / computed column is aliased identically on both sides;
  *  - timestamps are output as epoch microseconds (`unix_micros` ↔
  *    `epoch_us`) — never raw TIMESTAMP, avoiding tz/precision skew;
  *  - DOUBLE *aggregates* are `round(x, 4)` on both sides (aggregation order
  *    differs between engines in the last ulp); scalar double arithmetic is
  *    left raw (IEEE-deterministic and identical);
  *  - every result has a deterministic total ORDER BY.
  */
object Catalog {

  case class Q(
      name: String,
      run: (SparkSession, String) => DataFrame,
      oracle: Option[String])

  private def q(name: String, oracle: String)(run: (SparkSession, String) => DataFrame): Q =
    Q(name, run, Some(oracle))

  private def qNoOracle(name: String)(run: (SparkSession, String) => DataFrame): Q =
    Q(name, run, None)

  // ---------------------------------------------------------------- core

  /** A4/A5 family: filtered multi-aggregate group-by (pricing summary). */
  val q01 = q(
    "q01_pricing_summary",
    """SELECT l_returnflag, l_linestatus,
      |       round(sum(l_quantity), 4)                       AS sum_qty,
      |       round(sum(l_extendedprice), 4)                  AS sum_base_price,
      |       round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
      |       round(avg(l_quantity), 4)                       AS avg_qty,
      |       round(avg(l_extendedprice), 4)                  AS avg_price,
      |       round(avg(CAST(l_quantity >= 25 AS DOUBLE)), 4) AS share_big,
      |       count(*)                                        AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") <= lit("1998-09-02 00:00:00").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum("l_quantity"), 4).as("sum_qty"),
        round(sum("l_extendedprice"), 4).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4).as("sum_disc_price"),
        round(avg("l_quantity"), 4).as("avg_qty"),
        round(avg("l_extendedprice"), 4).as("avg_price"),
        round(avg((col("l_quantity") >= 25).cast("double")), 4).as("share_big"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** A1/A4: exact median / quantile aggregation (DuckDB MEDIAN & QUANTILE_CONT
    * are exact → Spark exact `percentile`, NOT percentile_approx).
    */
  val q02 = q(
    "q02_quantiles",
    """SELECT l_returnflag,
      |       round(quantile_cont(l_quantity, 0.5), 4)      AS p50_qty,
      |       round(quantile_cont(l_quantity, 0.9), 4)      AS p90_qty,
      |       round(quantile_cont(l_extendedprice, 0.5), 4) AS p50_price,
      |       count(*)                                      AS n
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        round(percentile(col("l_quantity"), lit(0.5)), 4).as("p50_qty"),
        round(percentile(col("l_quantity"), lit(0.9)), 4).as("p90_qty"),
        round(percentile(col("l_extendedprice"), lit(0.5)), 4).as("p50_price"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag")
  }

  /** J1: broadcast equi-joins enriching the fact table with two dims. */
  val q03 = q(
    "q03_join_enrich",
    """SELECT p.p_brand, s.s_name,
      |       round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue,
      |       count(*) AS n_items
      |FROM lineitem l
      |JOIN part p     ON l.l_partkey = p.p_partkey
      |JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |GROUP BY p.p_brand, s.s_name
      |ORDER BY p.p_brand, s.s_name""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .join(broadcast(Tables.part(s, d)), col("l_partkey") === col("p_partkey"))
      .join(broadcast(Tables.supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("p_brand"), col("s_name"))
      .agg(
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy("p_brand", "s_name")
  }

  /** J2/F2: left-semi join (EXISTS). */
  val q04 = q(
    "q04_semi_join",
    """SELECT c.c_mktsegment, count(*) AS n_customers,
      |       round(sum(c.c_acctbal), 4) AS sum_bal
      |FROM customer c
      |WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
      |GROUP BY c.c_mktsegment
      |ORDER BY c.c_mktsegment""".stripMargin) { (s, d) =>
    Tables.customer(s, d)
      .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"), "left_semi")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers"), round(sum("c_acctbal"), 4).as("sum_bal"))
      .orderBy("c_mktsegment")
  }

  /** J6-family: left-anti join (NOT EXISTS). */
  val q05 = q(
    "q05_anti_join",
    """SELECT c.c_mktsegment, count(*) AS n_customers
      |FROM customer c
      |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
      |GROUP BY c.c_mktsegment
      |ORDER BY c.c_mktsegment""".stripMargin) { (s, d) =>
    Tables.customer(s, d)
      .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers"))
      .orderBy("c_mktsegment")
  }

  /** O4: top-k by ordered limit (TakeOrderedAndProject — no global sort). */
  val q06 = q(
    "q06_topk_latest",
    """SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us, value
      |FROM events
      |ORDER BY ts DESC, event_id DESC
      |LIMIT 50""".stripMargin) { (s, d) =>
    Tables.events(s, d)
      .orderBy(col("ts").desc, col("event_id").desc)
      .limit(50)
      .select(
        col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("ts_us"), col("value"))
  }

  /** W3: priority dedupe — top-1 per business key under a multi-component
    * ordering with a unique final tiebreak (the reference's IstDaten dedupe
    * shape, `02:263-325`).
    */
  val q07 = q(
    "q07_dedupe_priority",
    """SELECT user_id, event_type, event_id, epoch_us(ts) AS ts_us, value
      |FROM (SELECT *, row_number() OVER (
      |        PARTITION BY user_id, event_type
      |        ORDER BY value DESC, ts DESC, event_id) AS rn
      |      FROM events)
      |WHERE rn = 1
      |ORDER BY user_id, event_type""".stripMargin) { (s, d) =>
    Dedupe.topOnePerKey(
      Tables.events(s, d),
      keys = Seq(col("user_id"), col("event_type")),
      priority = Seq(col("value").desc, col("ts").desc, col("event_id").asc))
      .select(
        col("user_id"), col("event_type"), col("event_id"),
        unix_micros(col("ts")).as("ts_us"), col("value"))
      .orderBy("user_id", "event_type")
  }

  /** C6 + A4: 10-minute floor-bin tumbling aggregation. */
  val q08 = q(
    "q08_bin10_agg",
    """SELECT (epoch_us(ts) // 600000000) * 600 AS bin_epoch, event_type,
      |       count(*) AS n, round(avg(value), 4) AS avg_value,
      |       round(sum(value), 4) AS sum_value
      |FROM events
      |GROUP BY 1, 2
      |ORDER BY bin_epoch, event_type""".stripMargin) { (s, d) =>
    Tables.events(s, d)
      .groupBy(
        Macros.floorBinEpoch(col("ts"), 600).as("bin_epoch"),
        col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        round(avg("value"), 4).as("avg_value"),
        round(sum("value"), 4).as("sum_value"))
      .orderBy("bin_epoch", "event_type")
  }

  /** J5: AS-OF join — latest purchase by the same user at or before each
    * non-purchase event, staleness ≤ 1 h (union+window plan, not theta join).
    */
  val q09 = q(
    "q09_asof_join",
    """WITH np AS (SELECT * FROM events WHERE event_type <> 'purchase'),
      |     p  AS (SELECT * FROM events WHERE event_type = 'purchase'),
      |     m  AS (SELECT np.event_id AS eid, p.event_id AS pid, p.ts AS pts, p.value AS pval,
      |                   row_number() OVER (PARTITION BY np.event_id
      |                                      ORDER BY p.ts DESC, p.event_id DESC) AS rn
      |            FROM np JOIN p
      |              ON p.user_id = np.user_id AND p.ts <= np.ts
      |             AND epoch_us(np.ts) - epoch_us(p.ts) <= 3600000000)
      |SELECT e.event_id, e.user_id, epoch_us(e.ts) AS ts_us,
      |       m.pid AS purchase_id, epoch_us(m.pts) AS purchase_ts_us,
      |       m.pval AS purchase_value
      |FROM np e LEFT JOIN (SELECT * FROM m WHERE rn = 1) m ON m.eid = e.event_id
      |ORDER BY e.event_id""".stripMargin) { (s, d) =>
    val ev = Tables.events(s, d)
    val left = ev.filter(col("event_type") =!= "purchase")
    val right = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id").as("p_event_id"), col("value").as("p_value"))
    // Tolerance is on whole microseconds ↔ the oracle's epoch_us diff; our
    // cast("long") is whole seconds — 3600 s ≡ 3600000000 µs on both sides
    // only when sub-second parts are handled identically, so compare in µs.
    val joined = Asof.join(
      left, right,
      keys = Seq("user_id"),
      leftTime = "ts", rightTime = "ts",
      payloadCols = Map("p_event_id" -> "purchase_id", "p_value" -> "purchase_value"),
      toleranceSec = None,
      rightTieBreak = Some("p_event_id"))
    joined
      .withColumn("__fresh",
        col("asof_ts").isNotNull &&
          (unix_micros(col("ts")) - unix_micros(col("asof_ts"))) <= 3600000000L)
      .select(
        col("event_id"), col("user_id"), unix_micros(col("ts")).as("ts_us"),
        when(col("__fresh"), col("purchase_id")).as("purchase_id"),
        when(col("__fresh"), unix_micros(col("asof_ts"))).as("purchase_ts_us"),
        when(col("__fresh"), col("purchase_value")).as("purchase_value"))
      .orderBy("event_id")
  }

  /** W4: lag + row-frame + range-frame (7-day) windows per key. */
  val q10 = q(
    "q10_rolling_windows",
    """SELECT user_id, event_id, epoch_us(ts) AS ts_us,
      |       lag(value) OVER w1 AS prev_value,
      |       round(avg(value) OVER (w1 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS avg3,
      |       round(sum(value) OVER (PARTITION BY user_id ORDER BY epoch_us(ts) // 1000000
      |                              RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW), 4) AS sum_7d
      |FROM events
      |WINDOW w1 AS (PARTITION BY user_id ORDER BY ts, event_id)
      |ORDER BY user_id, event_id""".stripMargin) { (s, d) =>
    val w1 = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val wr = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").cast("long"))
      .rangeBetween(-604800L, 0L)
    Tables.events(s, d)
      .select(
        col("user_id"), col("event_id"), unix_micros(col("ts")).as("ts_us"),
        lag(col("value"), 1).over(w1).as("prev_value"),
        round(avg(col("value")).over(w1.rowsBetween(-2, 0)), 4).as("avg3"),
        round(sum(col("value")).over(wr), 4).as("sum_7d"))
      .orderBy("user_id", "event_id")
  }

  /** C2–C4: the reference's bin macros (when-chains) driving a group-by. */
  val q11 = q(
    "q11_value_bins",
    """SELECT
      |  CASE WHEN l_discount * 60 IS NULL THEN NULL
      |       WHEN l_discount * 60 <= 0   THEN 'no_rain'
      |       WHEN l_discount * 60 < 0.5  THEN 'drizzle'
      |       WHEN l_discount * 60 < 2    THEN 'light'
      |       WHEN l_discount * 60 < 5    THEN 'moderate'
      |       ELSE 'heavy' END AS rain_bin,
      |  CASE WHEN l_quantity / 2 IS NULL THEN NULL
      |       WHEN l_quantity / 2 < 4  THEN 'calm'
      |       WHEN l_quantity / 2 < 8  THEN 'breeze'
      |       WHEN l_quantity / 2 < 14 THEN 'moderate'
      |       WHEN l_quantity / 2 < 21 THEN 'fresh'
      |       ELSE 'strong' END AS wind_bin,
      |  CASE WHEN l_quantity - 15 IS NULL THEN NULL
      |       WHEN l_quantity - 15 < 0  THEN '<0'
      |       WHEN l_quantity - 15 < 10 THEN '0-10'
      |       WHEN l_quantity - 15 < 20 THEN '10-20'
      |       WHEN l_quantity - 15 < 30 THEN '20-30'
      |       ELSE '>=30' END AS temp_bin,
      |  count(*) AS n, round(sum(l_extendedprice), 4) AS sum_price
      |FROM lineitem
      |GROUP BY 1, 2, 3
      |ORDER BY rain_bin, wind_bin, temp_bin""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .groupBy(
        Macros.rainBin(col("l_discount") * 60).as("rain_bin"),
        Macros.windBin(col("l_quantity") / 2).as("wind_bin"),
        Macros.tempBin(col("l_quantity") - 15).as("temp_bin"))
      .agg(count(lit(1)).as("n"), round(sum("l_extendedprice"), 4).as("sum_price"))
      .orderBy("rain_bin", "wind_bin", "temp_bin")
  }

  /** A7: single-pass missing-value profile (nulls synthesized
    * deterministically so the profile is non-trivial).
    */
  val q12 = q(
    "q12_missing_profile",
    """WITH t AS (SELECT CASE WHEN event_type = 'error' THEN NULL ELSE value END AS value_clean,
      |                  CASE WHEN user_id % 10 = 0 THEN NULL ELSE user_id END AS user_clean,
      |                  nullif(props, '{"k": 69}') AS props_clean
      |           FROM events)
      |SELECT column_name, n_null, round(null_frac, 4) AS null_frac FROM (
      |  SELECT 'value_clean' AS column_name,
      |         sum(CAST(value_clean IS NULL AS BIGINT)) AS n_null,
      |         avg(CAST(value_clean IS NULL AS DOUBLE)) AS null_frac FROM t
      |  UNION ALL
      |  SELECT 'user_clean', sum(CAST(user_clean IS NULL AS BIGINT)),
      |         avg(CAST(user_clean IS NULL AS DOUBLE)) FROM t
      |  UNION ALL
      |  SELECT 'props_clean', sum(CAST(props_clean IS NULL AS BIGINT)),
      |         avg(CAST(props_clean IS NULL AS DOUBLE)) FROM t)
      |ORDER BY column_name""".stripMargin) { (s, d) =>
    val t = Tables.events(s, d).select(
      when(col("event_type") === "error", lit(null)).otherwise(col("value")).as("value_clean"),
      when(col("user_id") % 10 === 0, lit(null)).otherwise(col("user_id")).as("user_clean"),
      nullif(col("props"), lit("""{"k": 69}""")).as("props_clean"))
    Profile.missingProfile(t, Seq("value_clean", "user_clean", "props_clean"))
      .select(col("column_name"), col("n_null"), round(col("null_frac"), 4).as("null_frac"))
      .orderBy("column_name")
  }

  /** A8 + C15: day-of-week × hour heatmap aggregate (ISO dow on both sides). */
  val q13 = q(
    "q13_heatmap_dow_hour",
    """SELECT isodow(ts) AS dow, hour(ts) AS hr,
      |       count(*) AS n, round(avg(value), 4) AS avg_value
      |FROM events
      |GROUP BY 1, 2
      |ORDER BY dow, hr""".stripMargin) { (s, d) =>
    Tables.events(s, d)
      .groupBy(Macros.isoDow(col("ts")).as("dow"), hour(col("ts")).as("hr"))
      .agg(count(lit(1)).as("n"), round(avg("value"), 4).as("avg_value"))
      .orderBy("dow", "hr")
  }

  /** C1/C5: DuckDB date_diff('minute') boundary-crossing semantics + epoch
    * second diffs (the reference's delay macros).
    */
  val q14 = q(
    "q14_delay_semantics",
    """SELECT l.l_returnflag,
      |       round(avg(CAST(date_diff('minute', o.o_orderdate, l.l_shipdate) AS DOUBLE)), 4) AS avg_delay_min,
      |       round(avg(CAST(date_diff('second', o.o_orderdate, l.l_shipdate) AS DOUBLE)), 4) AS avg_delay_sec,
      |       max(date_diff('minute', o.o_orderdate, l.l_shipdate)) AS max_delay_min,
      |       count(*) AS n
      |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      |GROUP BY l.l_returnflag
      |ORDER BY l.l_returnflag""".stripMargin) { (s, d) =>
    val delayMin = Macros.delayMinutes(col("l_shipdate"), col("o_orderdate"))
    val delaySec = Macros.delaySeconds(col("l_shipdate"), col("o_orderdate"))
    Tables.lineitem(s, d)
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_returnflag"))
      .agg(
        round(avg(delayMin), 4).as("avg_delay_min"),
        round(avg(delaySec.cast("double")), 4).as("avg_delay_sec"),
        max(delayMin.cast("long")).as("max_delay_min"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag")
  }

  /** S10/S11 semantics as a query: delete+insert upsert = anti-join ∪ incoming. */
  val q15 = q(
    "q15_merge_upsert",
    """WITH incoming AS (
      |  SELECT o_orderkey, o_custkey, 'UPDATED' AS o_orderstatus,
      |         o_totalprice * 1.1 AS o_totalprice
      |  FROM orders WHERE o_orderkey % 7 = 0)
      |SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice FROM (
      |  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
      |  FROM orders o WHERE NOT EXISTS
      |    (SELECT 1 FROM incoming i WHERE i.o_orderkey = o.o_orderkey)
      |  UNION ALL
      |  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice FROM incoming)
      |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    val existing = Tables.orders(s, d)
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    val incoming = Tables.orders(s, d)
      .filter(col("o_orderkey") % 7 === 0)
      .select(
        col("o_orderkey"), col("o_custkey"),
        lit("UPDATED").as("o_orderstatus"),
        (col("o_totalprice") * 1.1).as("o_totalprice"))
    Merge.upsertByKey(existing, incoming, Seq("o_orderkey"))
      .orderBy("o_orderkey")
  }

  /** O6: exact distinct. */
  val q16 = q(
    "q16_distinct",
    """SELECT DISTINCT l_returnflag, l_linestatus, strftime(l_shipdate, '%Y-%m') AS ship_month
      |FROM lineitem
      |ORDER BY l_returnflag, l_linestatus, ship_month""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .select(
        col("l_returnflag"), col("l_linestatus"),
        Macros.monthKey(col("l_shipdate")).as("ship_month"))
      .distinct()
      .orderBy("l_returnflag", "l_linestatus", "ship_month")
  }

  /** J2: cascading semi-join prune (the reference's GTFS shape `01:178-223`). */
  val q17 = q(
    "q17_semi_cascade",
    """SELECT l.l_returnflag, count(*) AS n, round(sum(l.l_quantity), 4) AS sum_qty
      |FROM lineitem l
      |WHERE EXISTS (
      |  SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey AND EXISTS (
      |    SELECT 1 FROM customer c
      |    WHERE c.c_custkey = o.o_custkey AND c.c_mktsegment = 'BUILDING'))
      |GROUP BY l.l_returnflag
      |ORDER BY l.l_returnflag""".stripMargin) { (s, d) =>
    val goodCust = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
    val goodOrders = Tables.orders(s, d)
      .join(goodCust, col("o_custkey") === col("c_custkey"), "left_semi")
    Tables.lineitem(s, d)
      .join(goodOrders, col("l_orderkey") === col("o_orderkey"), "left_semi")
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 4).as("sum_qty"))
      .orderBy("l_returnflag")
  }

  /** C14 + C16: composite dot-key + cyclic hour encodings. */
  val q18 = q(
    "q18_keys_cyclic",
    """SELECT l_returnflag || '·' || l_linestatus AS flag_key,
      |       hour(l_shipdate) AS hr,
      |       round(sin(hour(l_shipdate) * 2 * pi() / 24), 4) AS sin_hour,
      |       round(cos(hour(l_shipdate) * 2 * pi() / 24), 4) AS cos_hour,
      |       count(*) AS n
      |FROM lineitem
      |GROUP BY 1, 2, 3, 4
      |ORDER BY flag_key, hr""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .groupBy(
        Macros.dotKey(col("l_returnflag"), col("l_linestatus")).as("flag_key"),
        hour(col("l_shipdate")).as("hr"),
        round(Macros.sinHour(hour(col("l_shipdate"))), 4).as("sin_hour"),
        round(Macros.cosHour(hour(col("l_shipdate"))), 4).as("cos_hour"))
      .agg(count(lit(1)).as("n"))
      .orderBy("flag_key", "hr")
  }

  /** All registered queries, in catalog order. */
  def all: Seq[Q] = Seq(
    q01, q02, q03, q04, q05, q06, q07, q08, q09,
    q10, q11, q12, q13, q14, q15, q16, q17, q18)
}
