package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Central registry: operator name -> (spark, sfDir) -> DataFrame, plus the
  * DuckDB oracle SQL for each SQL-expressible query.
  *
  * Conventions (driver compare sorts columns by name then hashes values):
  *  - identical lowercase column names on both sides;
  *  - deterministic ordering (unique sort key) on both sides;
  *  - counts cast to BIGINT in DuckDB (Spark count() is long);
  *  - sums of 2-decimal data rounded at 2 decimals (never near a rounding
  *    boundary); means expressed as round(sum,2)/count so both engines
  *    compute bit-identical doubles.
  */
object Queries {

  type Q = (SparkSession, String) => DataFrame

  def all: Map[String, Q] =
    core ++ TransformQueries.queries ++ VrlQueries.queries ++
      DatapipeQueries.queries ++ CodecQueries.queries ++
      SinkQueries.queries
  def oracles: Map[String, String] =
    coreSql ++ TransformQueries.oracles ++ VrlQueries.oracles ++
      DatapipeQueries.oracles ++ CodecQueries.oracles ++
      SinkQueries.oracles

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Graft.table(s, dir, name)

  /** Bind an expensive struct/map-producing expression as a REAL column in
    * its own projection, then project out of it. Inlining `parsed` into
    * every output column re-evaluates the whole parser per field —
    * CollapseProject won't merge the two projections because the producer
    * is non-cheap and referenced more than once, so the parser runs ONCE
    * per row. (Higher-order-function subtrees are CodegenFallback and get
    * no runtime subexpression elimination, so this matters doubly for
    * map-valued decoders.)
    */
  def withParsed(df: DataFrame, parsed: Column)
                (fields: Column => Seq[Column]): DataFrame =
    df.withColumn("__parsed", parsed).select(fields(col("__parsed")): _*)

  /** The headline filter -> remap -> reduce log pipeline, shared by the
    * oracle query and the Bench throughput measurement.
    */
  /** The remap stage alone (filter + JSON field extract + computed
    * columns) — the shape of the reference's `*_remap_blackhole`
    * regression cases, measured separately by Bench as pure per-event
    * throughput (no aggregation).
    */
  def eventsRemap(ev: DataFrame): DataFrame =
    ev.filter(col("value") > 1.0)
      .withColumn("k", Graft.jsonLong(col("props"), "k"))
      .withColumn("severity", when(col("event_type") === "error", 3).otherwise(6))
      // concat beats format_string here: no printf-style interpreter in
      // the per-event loop
      .withColumn(
        "msg",
        concat(col("event_type"), lit(":"), col("severity").cast("string")))

  def eventsPipeline(ev: DataFrame): DataFrame = {
    val remapped = eventsRemap(ev)
    remapped
      // group on the DATE value and render the "yyyy-MM-dd" string once
      // per GROUP after the agg — the formatter runs ~1000× less often
      // than formatting in the per-row key (measured 12-20% on the
      // whole pipeline at sf0.1; same calendar-day grouping either way)
      .groupBy(col("user_id"), to_date(col("ts")).as("__day"))
      .agg(
        count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("total_value"),
        sum(col("k")).as("sum_k"),
        min_by(col("event_type"), col("event_id")).as("first_type"),
        // joined to a scalar string: the driver's pandas compare can't
        // sort array cells, and at scale a fixed-width string beats a
        // nested column for the downstream sink anyway
        array_join(array_sort(collect_set(col("event_type"))), ",").as("types"),
        concat_ws("|",
          transform(
            array_sort(collect_list(struct(col("event_id"), col("msg")))),
            x => x.getField("msg"))).as("msgs"))
      .select(col("user_id"), date_format(col("__day"), "yyyy-MM-dd").as("day"),
        col("n_events"), col("total_value"), col("sum_k"),
        col("first_type"), col("types"), col("msgs"))
  }

  /** Structured-log class (BASELINE: ~25 MiB/s/vCPU): full JSON parse →
    * typed columns → re-encode JSON — the reference's
    * http_text_to_http_json transcode regression shape. Everything stays
    * inside whole-stage codegen (from_json/to_json are native).
    */
  def eventsStructured(ev: DataFrame): DataFrame =
    withParsed(ev, from_json(col("props"),
        org.apache.spark.sql.types.StructType.fromDDL("k BIGINT"))) { p =>
      Seq(col("event_id"),
        to_json(struct(
          col("event_id").as("id"),
          col("event_type").as("kind"),
          unix_micros(col("ts")).as("ts_us"),
          col("user_id").as("user"),
          round(col("value"), 3).as("value"),
          p.getField("k").as("k"),
          (p.getField("k") % 16).cast("string").as("bucket"))).as("body"))
    }

  /** Metric class (BASELINE: ~25 MiB/s/vCPU ≈ 100k samples/s/vCPU): each
    * event fans out to two metric samples (counter + gauge, the
    * log_to_metric shape), then one map-side-combined groupBy aggregates
    * per series — the aggregate-transform pipeline. The fan-out doubles
    * the sample count, so Bench reports samples/s alongside MiB/s.
    */
  def metricsPipeline(ev: DataFrame): DataFrame = {
    val samples = ev.select(col("event_type"), col("ts"),
        explode(array(
          struct(lit("events_total").as("name"),
            lit("incremental").as("kind"), lit(1.0).as("v")),
          struct(lit("value_gauge").as("name"),
            lit("absolute").as("kind"), col("value").as("v")))).as("m"))
    samples.groupBy(col("m.name"), col("m.kind"), col("event_type"),
        date_format(col("ts"), "yyyy-MM-dd-HH").as("hour"))
      .agg(count(lit(1)).as("n"), round(sum(col("m.v")), 2).as("sum_v"),
        max(col("m.v")).as("max_v"))
  }

  // ---------------------------------------------------------------------
  // Relational showcase (TPC-H-flavored) — exercises scan+filter+agg+join
  // ---------------------------------------------------------------------

  private lazy val core: Map[String, Q] = Map(
    "q1_agg" -> { (s, dir) =>
      val li = t(s, dir, "lineitem")
      // sums go through decimal(30,6): double accumulation is
      // order-dependent (partitioning changes the sum order), so a
      // double sum can round across a cent boundary differently per
      // plan; a decimal sum is exact and associative — same result on
      // any partitioning, matching the oracle bit-for-bit
      def dsum(c: Column): Column =
        round(sum(c.cast("decimal(30,6)")), 2).cast("double")
      li.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          dsum(col("l_extendedprice") * (lit(1) - col("l_discount")))
            .as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .withColumn("avg_qty", col("sum_qty") / col("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },

    // Headline pipeline: filter -> remap -> reduce over the log-shaped
    // `events` table (Vector: filter + remap + reduce transforms).
    "events_pipeline" -> { (s, dir) =>
      eventsPipeline(t(s, dir, "events")).orderBy(col("user_id"), col("day"))
    },

    // `filter` transform (src/transforms/filter.rs): drop non-matching.
    "filter" -> { (s, dir) =>
      t(s, dir, "events")
        .filter(col("event_type") === "error" && col("value") > 50.0)
        .select(col("event_id"), col("user_id"), round(col("value"), 2).as("value"))
        .orderBy(col("event_id"))
    }
  )

  private lazy val coreSql: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(round(sum(CAST(l_quantity AS DECIMAL(30,6))),2) AS DOUBLE) AS sum_qty,
        |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(30,6))),2) AS DOUBLE) AS sum_base_price,
        |  CAST(round(sum(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(30,6))),2) AS DOUBLE) AS sum_disc_price,
        |  CAST(count(*) AS BIGINT) AS count_order,
        |  CAST(round(sum(CAST(l_quantity AS DECIMAL(30,6))),2) AS DOUBLE) / CAST(count(*) AS BIGINT) AS avg_qty
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "events_pipeline" ->
      """WITH remapped AS (
        |  SELECT event_id, user_id, ts, event_type, value,
        |    CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
        |    CASE WHEN event_type = 'error' THEN 3 ELSE 6 END AS severity
        |  FROM events WHERE value > 1.0
        |)
        |SELECT user_id, strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS day,
        |  CAST(count(*) AS BIGINT) AS n_events,
        |  round(sum(value),2) AS total_value,
        |  CAST(sum(k) AS BIGINT) AS sum_k,
        |  min_by(event_type, event_id) AS first_type,
        |  array_to_string(list_sort(list(DISTINCT event_type)), ',') AS types,
        |  string_agg(event_type || ':' || CAST(severity AS VARCHAR), '|' ORDER BY event_id) AS msgs
        |FROM remapped
        |GROUP BY user_id, strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d')
        |ORDER BY user_id, day""".stripMargin,

    "filter" ->
      """SELECT event_id, user_id, round(value,2) AS value
        |FROM events WHERE event_type = 'error' AND value > 50.0
        |ORDER BY event_id""".stripMargin
  )
}
