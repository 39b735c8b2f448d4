package graft.queries

import graft.Tables
import graft.functions.{GeoFunctions, Portable, TimeFunctions}
import graft.operators.Relational
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Relational query pack — SURVEY.md §2C C1-C14: scan/project/filter,
  * aggregation, time windows, joins (broadcast star, semi/anti, as-of),
  * latest-by-key, top-k, set ops, sort/limit, scalar date/math/geo.
  *
  * Every query returns only cross-engine-deterministic columns (see
  * `graft.functions.Portable`): integer counts/cents, canonical timestamp
  * strings, or per-row IEEE arithmetic. Paired DuckDB oracle SQL lives in
  * [[RelationalQueries.oracles]].
  */
object RelationalQueries {

  /** Normalized events table: `ts` forced to micro-precision TimestampType
    * regardless of how the engine surfaces the parquet NANOS type. */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = Tables.events(s, d)
    val tsNorm = raw.schema("ts").dataType match {
      case LongType => timestamp_micros((col("ts") / 1000).cast("long"))
      case _        => col("ts").cast("timestamp")
    }
    raw.withColumn("ts", tsNorm)
  }

  // C1/C2/C3: scan with pushed filter + pruned projection.
  def q01ScanFilterProject(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") < lit("1995-06-01").cast("timestamp") && col("l_quantity") < 10)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity").cast("long").as("qty"),
        Portable.cents(col("l_extendedprice")).as("price_cents"))

  // C3: predicates — IN, BETWEEN, LIKE, boolean logic.
  def q02FilterPredicates(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .filter(col("c_mktsegment").isin("BUILDING", "AUTOMOBILE") &&
        col("c_acctbal").between(0, 5000) &&
        col("c_name").like("%9%"))
      .select("c_custkey", "c_name", "c_mktsegment")

  // C5: global aggregate.
  def q03AggGlobal(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d).agg(
      count(lit(1)).as("n_rows"),
      countDistinct(col("l_orderkey")).as("n_orders"),
      sum(col("l_quantity")).cast("long").as("sum_qty"),
      sum(Portable.cents(col("l_extendedprice"))).as("sum_price_cents"),
      min(Portable.cents(col("l_extendedprice"))).as("min_price_cents"),
      max(Portable.cents(col("l_extendedprice"))).as("max_price_cents"))

  // C5: grouped aggregate (TPC-H Q1 shape) with deterministic money math.
  def q04AggGroup(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(col("l_quantity")).cast("long").as("sum_qty"),
        sum(Portable.cents(col("l_extendedprice"))).as("sum_base_cents"),
        sum(Portable.cents(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("sum_disc_cents"),
        count(lit(1)).as("count_order"))
      .withColumn("avg_qty", Portable.ratio(col("sum_qty"), col("count_order")))

  // C6: tumbling event-time window (10 min — the telecom bucketing).
  def q05WindowTumbling(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .groupBy(window(col("ts"), "10 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(Portable.cents(col("value"))).as("value_cents"))
      .select(TimeFunctions.canonical(col("w.start")).as("window_start"),
        col("event_type"), col("n"), col("value_cents"))

  // C6: hopping window (10 min length, 5 min slide).
  def q06WindowHopping(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .groupBy(window(col("ts"), "10 minutes", "5 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(TimeFunctions.canonical(col("w.start")).as("window_start"),
        col("event_type"), col("n"))

  // C6: session window, 5-minute gap, per user. Timestamps truncated to
  // seconds FIRST so both engines sessionize identical values.
  def q07SessionWindow(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .withColumn("ts", date_trunc("second", col("ts")))
      .groupBy(session_window(col("ts"), "5 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n"), sum(Portable.cents(col("value"))).as("value_cents"))
      .select(col("user_id"),
        TimeFunctions.canonical(col("w.start")).as("session_start"),
        TimeFunctions.canonical(col("w.end")).as("session_end"),
        col("n"), col("value_cents"))

  // C7 + broadcast: star join, revenue per nation (TPC-H Q5 shape). Dims
  // broadcast explicitly — no shuffle of the fact side except the final agg.
  def q08JoinStar(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
    val o = Tables.orders(s, d)
    val c = Tables.customer(s, d)
    val n = Tables.nation(s, d)
    val r = Tables.region(s, d)
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name") === "ASIA")
      .groupBy(col("n_name"))
      .agg(sum(Portable.cents(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("revenue_cents"),
        count(lit(1)).as("n_items"))
  }

  // C7: stream-table enrichment (batch analog): events × broadcast customer dim.
  def q09JoinEnrich(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .join(broadcast(Tables.customer(s, d)), col("user_id") === col("c_custkey"), "left")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n"), sum(Portable.cents(col("value"))).as("value_cents"))

  // C9: latest-by-key (compacted-topic table view).
  def q10LatestByKey(s: SparkSession, d: String): DataFrame = {
    val e = events(s, d).withColumn("ts", date_trunc("second", col("ts")))
    Relational.latestByKey(e, Seq("user_id"), Seq(col("ts"), col("event_id")))
      .select(col("user_id"), col("event_id"), col("event_type"),
        TimeFunctions.canonical(col("ts")).as("ts_s"),
        Portable.cents(col("value")).as("value_cents"))
  }

  // C11: top-k per group.
  def q11TopKPerGroup(s: SparkSession, d: String): DataFrame =
    Relational.topKPerGroup(
      Tables.orders(s, d),
      Seq(col("o_orderpriority")),
      Seq(col("o_totalprice").desc, col("o_orderkey")),
      3)
      .select(col("o_orderpriority"), col("o_orderkey"),
        Portable.cents(col("o_totalprice")).as("total_cents"))

  // C4/C11: global order-by + limit under a strict total order.
  def q12OrderLimit(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
      .limit(100)
      .select(col("l_orderkey"), col("l_linenumber"),
        Portable.cents(col("l_extendedprice")).as("price_cents"))

  // C10: set operations (union / intersect / except, all distinct).
  def q13SetOps(s: SparkSession, d: String): DataFrame = {
    val p = Tables.part(s, d).select("p_partkey", "p_brand", "p_size")
    val a = p.filter(col("p_size") < 10)
    val b = p.filter(col("p_brand") === "Brand#13")
    a.unionByName(b).distinct()
      .exceptAll(a.intersect(b))
      .distinct()
  }

  // C3 via anti-join: customers with no orders, per segment.
  def q14AntiJoin(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_customers_no_orders"))

  // Semi-join: suppliers that shipped, per nation.
  def q15SemiJoin(s: SparkSession, d: String): DataFrame =
    Tables.supplier(s, d)
      .join(Tables.lineitem(s, d), col("s_suppkey") === col("l_suppkey"), "left_semi")
      .groupBy("s_nationkey")
      .agg(count(lit(1)).as("n_suppliers"))

  // C12: string scalar functions (the key-synthesis / location-string family).
  def q16StringFuncs(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .filter(col("c_custkey") < 200)
      .select(
        col("c_custkey"),
        regexp_extract(col("c_name"), "([0-9]+)", 1).as("digits"),
        upper(col("c_name")).as("upper_name"),
        substring(col("c_name"), 1, 8).as("prefix8"),
        concat_ws("|", col("c_mktsegment"), col("c_name")).as("joined"),
        length(col("c_name")).as("name_len"),
        element_at(split(col("c_name"), "#"), 1).as("name_head"))

  // C13: date/time scalar functions across the reference's 3 encodings.
  def q17DatetimeFuncs(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .filter(col("event_id") < 500)
      .select(
        col("event_id"),
        unix_timestamp(col("ts")).as("epoch_s"),
        year(col("ts")).as("y"),
        month(col("ts")).as("m"),
        dayofmonth(col("ts")).as("dom"),
        hour(col("ts")).as("h"),
        (weekday(col("ts")) + 1).as("isodow"),
        TimeFunctions.canonical(date_trunc("hour", col("ts"))).as("hour_start"),
        TimeFunctions.canonical(TimeFunctions.fromEpochMillis(
          (unix_timestamp(col("ts")) * 1000))).as("roundtrip_ms"))

  // C14: math scalar functions (exact-IEEE subset only).
  def q18MathFuncs(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_orderkey") < 100)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        abs(col("l_discount") - 0.05).as("abs_d"),
        ceil(col("l_extendedprice")).cast("long").as("ceil_price"),
        floor(col("l_extendedprice")).cast("long").as("floor_price"),
        round(col("l_extendedprice"), 1).as("round1"),
        sqrt(col("l_quantity")).as("sqrt_qty"),
        pmod(col("l_orderkey"), lit(7)).as("mod7"),
        greatest(col("l_tax"), col("l_discount")).as("gr"),
        least(col("l_tax"), col("l_discount")).as("le"))

  // C14: haversine geo distance over synthesized coordinates.
  def q19GeoHaversine(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d).select(
      col("c_custkey"),
      ((col("c_custkey") % 17000) / 100.0 - 85.0).as("lat1"),
      ((col("c_custkey") * 7 % 36000) / 100.0 - 180.0).as("lon1"),
      ((col("c_nationkey") * 700 % 17000) / 100.0 - 85.0).as("lat2"),
      ((col("c_nationkey") * 1400 % 36000) / 100.0 - 180.0).as("lon2"))
    c.select(col("c_custkey"),
      round(GeoFunctions.haversineMeters(col("lat1"), col("lon1"), col("lat2"), col("lon2")))
        .cast("long").as("dist_m"))
  }

  // C15: JSON extraction on the schemaless column.
  def q20Json(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
      .groupBy((col("k") % 10).as("k_mod"))
      .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"))

  // C2/C13 composite: rollup with grand total (free Catalyst capability).
  def q21Rollup(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .rollup(col("c_mktsegment"))
      .agg(count(lit(1)).as("n"), sum(Portable.cents(col("c_acctbal"))).as("bal_cents"))
      .select(coalesce(col("c_mktsegment"), lit("ALL")).as("segment"), col("n"), col("bal_cents"))

  // C5: exact percentiles (deterministic: integer-valued doubles, shared
  // linear-interpolation definition).
  def q22Quantiles(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(percentile(col("l_quantity"),
        array(lit(0.25), lit(0.5), lit(0.75))).as("_q"))
      .select(col("l_returnflag"),
        col("_q")(0).as("q25"), col("_q")(1).as("q50"), col("_q")(2).as("q75"))

  // As-of join: each event enriched with the latest order at-or-before its
  // time for the same customer (temporal stream-table join).
  def q23AsofJoin(s: SparkSession, d: String): DataFrame = {
    val e = events(s, d)
    val o = Tables.orders(s, d)
    Relational.asofJoinBackward(e, o, "user_id", "o_custkey", "ts", "o_orderdate",
        rightTiebreak = Some("o_orderkey"))
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n_events"),
        count(col("_asof.o_orderkey")).as("n_matched"),
        sum(col("_asof.o_orderkey")).as("sum_matched_orderkey"))
  }

  // Forward as-of: each event matched to the user's NEXT order at or
  // after the event time — the "what happened next" attribution query
  // (q23's mirror; same union + running-window shape).
  def q160AsofForward(s: SparkSession, d: String): DataFrame =
    Relational.asofJoinForward(events(s, d), Tables.orders(s, d),
        "user_id", "o_custkey", "ts", "o_orderdate",
        rightTiebreak = Some("o_orderkey"))
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n_events"),
        count(col("_asof.o_orderkey")).as("n_matched"),
        sum(col("_asof.o_orderkey")).as("sum_matched_orderkey"))

  // Forward as-of with a horizon (the q168 mirror): each event matched
  // to the user's NEXT purchase at-or-after its time, but only within
  // 1 day — the time-to-conversion attribution shape. Self-join against
  // the purchase sub-stream, so (unlike q160's cross-table arm, whose
  // fixture has no forward matches) BOTH arms carry real rows.
  def q171NextEventHorizon(s: SparkSession, d: String): DataFrame = {
    val e = events(s, d)
    val purchases = events(s, d).filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("event_id").as("p_event_id"))
    Relational.asofJoinForward(e, purchases, "user_id", "p_user", "ts", "p_ts",
        rightTiebreak = Some("p_event_id"), horizon = Some("1 day"))
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n_events"),
        count(col("_asof.p_event_id")).as("n_matched"),
        sum(col("_asof.p_event_id")).as("sum_matched_event_id"))
  }

  // C17: format conversion — binary/base64/hex round-trips.
  def q24FormatConv(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(
        col("doc_id"),
        base64(substring(col("text"), 1, 12).cast("binary")).as("b64"),
        hex(substring(col("text"), 1, 6).cast("binary")).as("hex6"),
        md5(col("text")).as("text_md5"),
        substring(unbase64(base64(col("text").cast("binary"))).cast("string"), 1, 20).as("roundtrip20"))

  // C17/C18 + B1-B4: registry-framed Avro round-trip WITH schema evolution
  // on read — rows encoded under schema v1 (custkey, name) are decoded
  // through the v2 reader (adds nullable c_note, default null) by
  // per-record schema-id dispatch. Output = original values + the default,
  // so the DuckDB oracle is a plain projection.
  def q25AvroRoundtrip(s: SparkSession, d: String): DataFrame = {
    val reg = new graft.registry.SchemaRegistry
    val v1 = reg.register("customer-value",
      """{"type":"record","name":"customer","namespace":"graft","fields":[
        |{"name":"c_custkey","type":["null","long"],"default":null},
        |{"name":"c_name","type":["null","string"],"default":null}]}""".stripMargin)
    reg.register("customer-value",
      """{"type":"record","name":"customer","namespace":"graft","fields":[
        |{"name":"c_custkey","type":["null","long"],"default":null},
        |{"name":"c_name","type":["null","string"],"default":null},
        |{"name":"c_note","type":["null","string"],"default":null}]}""".stripMargin)
    Tables.customer(s, d)
      .select(graft.formats.AvroFunctions.toAvroWire(
        struct(col("c_custkey"), col("c_name")), v1).as("payload"))
      .select(graft.formats.AvroFunctions.fromAvroRegistry(
        col("payload"), reg, "customer-value").as("rec"))
      .select("rec.c_custkey", "rec.c_name", "rec.c_note")
  }

  // C2/C15: array-of-struct construction, positional explode, and nested
  // field access — the `Polygon: array<record{lon,lat}>` shape of the
  // reference's grid topic (TelecomItalia-Milano-Grid.value.json:13-25).
  def q26NestedArray(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d).select(
      col("c_custkey"),
      ((col("c_custkey") % 17000) / 100.0 - 85.0).as("lat1"),
      ((col("c_custkey") * 7 % 36000) / 100.0 - 180.0).as("lon1"),
      ((col("c_nationkey") * 700 % 17000) / 100.0 - 85.0).as("lat2"),
      ((col("c_nationkey") * 1400 % 36000) / 100.0 - 180.0).as("lon2"))
    c.select(col("c_custkey"),
        array(
          struct(col("lat1").as("lat"), col("lon1").as("lon")),
          struct(col("lat2").as("lat"), col("lon2").as("lon"))).as("polygon"))
      .select(col("c_custkey"),
        col("polygon")(0)("lat").as("first_lat"),
        posexplode(col("polygon")).as(Seq("pos", "pt")))
      .select(col("c_custkey"), col("pos"), col("pt.lat"), col("pt.lon"), col("first_lat"))
  }

  // C8 batch analog: time-bounded equi-join of two event streams — each
  // event matched to OTHER events of the same user within ±10 minutes
  // (the stream-stream interval join's semantics on bounded data; the
  // streaming form with watermark state expiry is StreamOps.intervalJoin).
  // Bucketized on (user_id, floor(ts/10min))±1 — see Relational.intervalJoin
  // for why the time bound must ride an equi key, not a post-join filter.
  def q36IntervalJoin(s: SparkSession, d: String): DataFrame = {
    val a = events(s, d).select(col("user_id"), col("event_id").as("id_a"),
      col("ts").as("ts_a"), col("event_type").as("type_a"))
    val b = events(s, d).select(col("user_id").as("uid_b"), col("event_id").as("id_b"),
      col("ts").as("ts_b"))
    graft.operators.Relational.intervalJoin(a, "ts_a", b, "ts_b",
        col("user_id") === col("uid_b") && col("id_a") =!= col("id_b"), "10 minutes")
      .groupBy("type_a")
      .agg(count(lit(1)).as("n_matches"),
        countDistinct(col("id_a")).as("n_events_matched"),
        sum(col("id_b")).cast("long").as("sum_matched_ids"))
  }

  // Skew machinery in the gate: the salted equi-join must return EXACTLY
  // the plain join's rows (the salt is a partitioning detail, invisible in
  // results). The oracle is the plain join — any salt-replication bug
  // (lost rows, double-counted rows) breaks the hash match.
  def q48SaltedJoin(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d).select("l_suppkey", "l_extendedprice")
    val sup = Tables.supplier(s, d).select("s_suppkey", "s_nationkey")
    graft.operators.Relational.saltedEquiJoin(li, sup, "l_suppkey", "s_suppkey", saltBuckets = 8)
      .groupBy("s_nationkey")
      .agg(count(lit(1)).as("n"),
        sum(Portable.cents(col("l_extendedprice"))).as("price_cents"))
  }

  // B1/C18: schemaless-JSON on-ramp — the props column arrives with NO
  // declared schema (the reference's backblaze topic registers NULL
  // schemas). The engine infers a StructType distributed, registers it as
  // an Avro subject, round-trips the REGISTERED schema back to a
  // StructType (proving the registry carries the full structure), and
  // reads the column typed with it. The oracle replays the extraction
  // with DuckDB's JSON functions — matching values prove the inferred
  // types are the right ones.
  def q47SchemalessJson(s: SparkSession, d: String): DataFrame = {
    import graft.registry.{AvroSchemaConverter, SchemaInference, SchemaRegistry}
    val ev = events(s, d)
    val reg = new SchemaRegistry
    val registered = SchemaInference.registerJsonSubject(
      reg, "events-props-value", "props_value", ev, "props")
    val inferred = AvroSchemaConverter.toStructType(registered.schema)
    ev.select(from_json(col("props"), inferred).as("p"), col("event_type"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("p.k")).cast("long").as("sum_k"),
        min(col("p.k")).cast("long").as("min_k"),
        max(col("p.k")).cast("long").as("max_k"))
  }

  // C19 typed surface: a custom Aggregator[IN, BUF, OUT] over Dataset[Long]
  // — exact integer moments buffer, deterministic double finish (see
  // graft.functions.MomentsAgg). Grouped via the untyped bridge so it
  // composes with groupBy like any built-in.
  def q35TypedMoments(s: SparkSession, d: String): DataFrame = {
    val agg = udaf(new graft.functions.MomentsAgg, org.apache.spark.sql.Encoders.scalaLong)
    Tables.lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(agg(col("l_quantity").cast("long")).as("m"))
      .select(col("l_returnflag"), col("m.n"),
        round(col("m.mean"), 6).as("mean_qty"),
        round(col("m.variance"), 6).as("var_qty"))
  }

  // C5 sketch family: approximate percentile + count-min sketch (binary
  // sketch surfaced as its md5 fingerprint; approximations are engine-side
  // so the driver applies the rows-only check). Percentiles surface as
  // SCALAR double columns — an array column here crashed the round-2
  // driver-side canonicalizer (pandas can't sort ndarray cells), voiding
  // even the rows-only check.
  def q54Sketches(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(
        approx_percentile(col("l_extendedprice"), array(lit(0.5), lit(0.95)), lit(1000)).as("_pp"),
        approx_count_distinct(col("l_partkey")).as("approx_parts"),
        md5(count_min_sketch(col("l_suppkey"), lit(0.01d), lit(0.95d), lit(42))).as("cms_md5"))
      .select(col("l_returnflag"),
        col("_pp").getItem(0).as("p50"), col("_pp").getItem(1).as("p95"),
        col("approx_parts"), col("cms_md5"))

  // Sketch audit for q54 (round-8 driver-green companion): the EXACT
  // aggregates the sketches approximate, hash-gated against DuckDB —
  // exact interpolated percentiles over integer cents and the exact
  // distinct count — plus the sketch outputs re-stated as integer
  // accuracy flags: the approx percentile (rank error ≤ n/1000) must
  // land inside the exact [p45,p55] / [p90,p99] value band, the HLL
  // count within 15% (3× its 5% rsd). The sketch VALUES stay out of the
  // hash (engine-specific by design); their accuracy contract is not.
  def q54aSketchExact(s: SparkSession, d: String): DataFrame = {
    val cents = Portable.cents(col("l_extendedprice"))
    Tables.lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(
        percentile(cents, array(lit(0.45), lit(0.5), lit(0.55),
          lit(0.9), lit(0.95), lit(0.99))).as("_ex"),
        approx_percentile(cents, array(lit(0.5), lit(0.95)), lit(1000)).as("_ap"),
        count_distinct(col("l_partkey")).as("n_parts"),
        approx_count_distinct(col("l_partkey")).as("_adp"))
      .select(col("l_returnflag"),
        // p50 over integer cents interpolates at most a half step —
        // IEEE-exact, exported raw; p95's fractional interpolation is
        // rounded at 1e-3 (both engines compute a + (b−a)·frac in
        // doubles; the round absorbs last-ulp divergence)
        col("_ex").getItem(1).as("p50_cents"),
        round(col("_ex").getItem(4), 3).as("p95_cents"),
        col("n_parts"),
        (col("_ap").getItem(0) >= col("_ex").getItem(0) &&
          col("_ap").getItem(0) <= col("_ex").getItem(2))
          .cast("int").as("p50_in_band"),
        (col("_ap").getItem(1) >= col("_ex").getItem(3) &&
          col("_ap").getItem(1) <= col("_ex").getItem(5))
          .cast("int").as("p95_in_band"),
        (abs(col("_adp") - col("n_parts")) * 100 <= col("n_parts") * 15)
          .cast("int").as("parts_within_15pct"))
  }

  // Record linkage: a deterministically corrupted copy of the customer
  // names (one character substituted, position driven by the key)
  // re-linked to the clean table by nation-blocked fuzzy join — every
  // candidate pair and edit distance hash-checked (DuckDB implements the
  // same Levenshtein).
  def q79FuzzyJoin(s: SparkSession, d: String): DataFrame = {
    // composite blocking (nation × key-hash bucket) — the standard ER move
    // when a single block's occupancy² gets expensive; the dirty copy
    // keeps its key, so true pairs always share the bucket
    val cust = Tables.customer(s, d).select(col("c_custkey"), col("c_nationkey"),
      pmod(col("c_custkey"), lit(20)).as("c_blk"), col("c_name"))
    val pos = pmod(col("c_custkey"), lit(8)) + 10 // inside the digit run of "Customer#…"
    val dirty = cust.select(
      col("c_custkey").as("d_custkey"), col("c_nationkey").as("d_nationkey"),
      col("c_blk").as("d_blk"),
      concat(col("c_name").substr(lit(1), pos - 1), lit("x"),
        col("c_name").substr(pos + 1, lit(99))).as("d_name"))
    graft.operators.Relational.fuzzyJoin(cust, dirty,
        Seq("c_nationkey" -> "d_nationkey", "c_blk" -> "d_blk"),
        "c_name", "d_name", maxDist = 1)
      .select(col("c_custkey"), col("d_custkey"), col("edit_dist"))
  }

  // Analytic-window (OVER-clause) surface: per-customer order-history
  // features — sequence number (row_number), days since the previous
  // order (lag), running spend (rows-frame sum), and the customer's
  // spend quartile (ntile under a second sort order). Both windows share
  // one partitioning key, so the plan pays ONE shuffle and two in-memory
  // sorts — at 100 TB the partition key (customer) bounds each sort to a
  // customer's history, never a global order.
  def q128WindowAnalytics(s: SparkSession, d: String): DataFrame = {
    val chrono = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val run = chrono.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val spend = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    Tables.orders(s, d).select(
      col("o_orderkey"), col("o_custkey"),
      row_number().over(chrono).as("seq"),
      datediff(col("o_orderdate").cast("date"),
        lag(col("o_orderdate").cast("date"), 1).over(chrono)).as("gap_days"),
      sum(Portable.cents(col("o_totalprice"))).over(run).as("run_cents"),
      ntile(4).over(spend).as("spend_quartile"))
  }

  // Snapshot diff (CDC): the audit a pipeline runs between yesterday's
  // and today's corpus export. The second snapshot is a deterministically
  // evolved copy of `documents` (the q79 convention — construct the
  // phenomenon, then prove the operator on it): doc_id % 7 == 0 deleted,
  // doc_id % 5 == 0 revised, doc_id % 11 == 0 re-added under a shifted
  // key — so all three change classes appear at every scale factor.
  def q129SnapshotDiff(s: SparkSession, d: String): DataFrame = {
    val old = Tables.documents(s, d).select("doc_id", "text")
    val kept = old.filter(pmod(col("doc_id"), lit(7)) =!= 0)
      .withColumn("text", when(pmod(col("doc_id"), lit(5)) === 0,
        concat(col("text"), lit(" (rev 2)"))).otherwise(col("text")))
    val added = old.filter(pmod(col("doc_id"), lit(11)) === 0)
      .select((col("doc_id") + 1000000).as("doc_id"), col("text"))
    Relational.snapshotDiff(old, kept.unionByName(added),
      keys = Seq("doc_id"), compareCols = Seq("text"))
  }

  // CDC changelog apply (MERGE): a deterministically constructed change
  // stream — revisions (seq 1), deletes (seq 2), inserts under shifted
  // keys, and a late re-upsert (seq 3) that RESURRECTS a deleted key
  // (doc_id % 35 hits both the revise and delete classes, so latest-wins
  // ordering is exercised, not just set difference) — applied to the
  // documents snapshot. Gate exports the merged state (id + text md5).
  def q140ApplyChanges(s: SparkSession, d: String): DataFrame = {
    val snap = Tables.documents(s, d).select("doc_id", "text")
    val rev2 = snap.filter(pmod(col("doc_id"), lit(5)) === 0)
      .withColumn("text", concat(col("text"), lit(" (rev 2)")))
      .withColumn("op", lit("upsert")).withColumn("seq", lit(1L))
    val dels = snap.filter(pmod(col("doc_id"), lit(7)) === 0)
      .withColumn("op", lit("delete")).withColumn("seq", lit(2L))
    val ins = snap.filter(pmod(col("doc_id"), lit(11)) === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
      .withColumn("op", lit("upsert")).withColumn("seq", lit(1L))
    val rev3 = snap.filter(pmod(col("doc_id"), lit(35)) === 0)
      .withColumn("text", concat(col("text"), lit(" (rev 3)")))
      .withColumn("op", lit("upsert")).withColumn("seq", lit(3L))
    Relational.applyChanges(snap,
        rev2.unionByName(dels).unionByName(ins).unionByName(rev3),
        Seq("doc_id"), "op", "seq")
      .select(col("doc_id"), md5(col("text")).as("text_md5"))
  }

  // Gap-based sessionization: label every event with its per-user
  // session sequence number (new session when the gap exceeds 30
  // minutes; the row-labeling complement of q07's session-window AGG —
  // attribution needs the label on the event, not the rollup).
  def q142Sessionize(s: SparkSession, d: String): DataFrame =
    graft.operators.Events.sessionize(events(s, d), "user_id", "ts",
        "30 minutes", Seq(col("event_id")))
      .select(col("user_id"), col("event_id"), col("session_seq"))

  // Ordered conversion funnel view -> click -> purchase with a 7-day
  // window from the first step: per user the earliest completion time
  // of each successive step, later steps strictly after earlier ones.
  def q143Funnel(s: SparkSession, d: String): DataFrame =
    graft.operators.Events.funnelSteps(events(s, d), "user_id", "ts",
        "event_type", Seq("view", "click", "purchase"), Some("7 days"))
      .select(col("user_id"),
        TimeFunctions.canonical(col("step_1_ts")).as("step_1_ts"),
        TimeFunctions.canonical(col("step_2_ts")).as("step_2_ts"),
        TimeFunctions.canonical(col("step_3_ts")).as("step_3_ts"),
        col("furthest_step"))

  // Funnel over the WHOLE key universe (the BI convention): every
  // distinct user appears, never-started users with furthest_step 0 and
  // null step times — q143's sibling via emitAllKeys, so SQL consumers
  // get the zeros-included shape without hand-writing the universe join.
  def q166FunnelUniverse(s: SparkSession, d: String): DataFrame =
    graft.operators.Events.funnelSteps(events(s, d), "user_id", "ts",
        "event_type", Seq("view", "click", "purchase"), Some("7 days"),
        emitAllKeys = true)
      .select(col("user_id"),
        TimeFunctions.canonical(col("step_1_ts")).as("step_1_ts"),
        TimeFunctions.canonical(col("step_2_ts")).as("step_2_ts"),
        TimeFunctions.canonical(col("step_3_ts")).as("step_3_ts"),
        col("furthest_step"))

  // Cohort retention matrix: users bucketed by first-activity week
  // (fixed 7-day UTC periods), distinct active users per (cohort,
  // week offset).
  def q144Retention(s: SparkSession, d: String): DataFrame =
    graft.operators.Events.retentionCohorts(events(s, d), "user_id", "ts",
      periodDays = 7)

  // Keyed time-series gap fill on a 6-hour grid: per-user spend (cents)
  // resampled first-to-last observation, empty slots carrying LOCF /
  // NOCB and the exact integer-lerp interpolation.
  def q145GapFill(s: SparkSession, d: String): DataFrame =
    graft.operators.Events.gapFill(
        events(s, d).select(col("user_id"), col("ts"),
          Portable.cents(col("value")).as("cents")),
        "user_id", "ts", "cents", "6 hours")
      .select(col("user_id"), TimeFunctions.canonical(col("slot_ts")).as("slot_ts"),
        col("observed"), col("locf"), col("nocb"), col("interp_micro"))

  // Trailing 24-hour rolling spend per user: RANGE-frame window (equal
  // timestamps are peers — no tiebreak contract), integer cents.
  def q147RollingAgg(s: SparkSession, d: String): DataFrame =
    graft.operators.Events.rollingAgg(
        events(s, d).select(col("user_id"), col("event_id"), col("ts"),
          Portable.cents(col("value")).as("cents")),
        "user_id", "ts", "cents", "1 day")
      .select(col("user_id"), col("event_id"), col("roll_sum"), col("roll_cnt"))

  // Events-family composition (the q46/q77/q127 convention — one
  // composition gate per operator family): sessionization, the funnel,
  // and the rolling 24-hour peak joined into one per-user analytics
  // mart, every stage an engine operator. Funnel non-starters keep a
  // row (left join + furthest 0) — the mart covers every active user.
  def q149AnalyticsMart(s: SparkSession, d: String): DataFrame = {
    val e = events(s, d)
    val sess = graft.operators.Events.sessionize(e, "user_id", "ts",
        "30 minutes", Seq(col("event_id")))
      .groupBy("user_id")
      .agg(max(col("session_seq")).as("n_sessions"),
        count(lit(1)).as("n_events"),
        sum(Portable.cents(col("value"))).as("value_cents"))
    val fun = graft.operators.Events.funnelSteps(e, "user_id", "ts",
        "event_type", Seq("view", "click", "purchase"), Some("7 days"))
      .select(col("user_id"), col("furthest_step"))
    val roll = graft.operators.Events.rollingAgg(
        e.select(col("user_id"), col("ts"), Portable.cents(col("value")).as("cents")),
        "user_id", "ts", "cents", "1 day")
      .groupBy("user_id").agg(max(col("roll_sum")).as("peak_24h_cents"))
    sess.join(fun, Seq("user_id"), "left")
      .join(roll, Seq("user_id"))
      .select(col("user_id"), col("n_sessions"), col("n_events"),
        col("value_cents"), coalesce(col("furthest_step"), lit(0)).as("furthest_step"),
        col("peak_24h_cents"))
  }

  // Bucketized numeric range join: orders priced into overlapping value
  // bands (half-open [lo, hi)) — the banding/tiering join Spark would
  // otherwise plan as a BroadcastNestedLoopJoin. 120 bands of width
  // 8000 stepped 5000 apart, so most orders match 1-2 bands.
  def q150RangeJoin(s: SparkSession, d: String): DataFrame = {
    val bands = s.range(120).select(col("id").cast("long").as("band_id"),
      (col("id") * 5000L).as("band_lo"), (col("id") * 5000L + 8000L).as("band_hi"))
    Relational.rangeJoin(
        Tables.orders(s, d).select("o_orderkey", "o_totalprice"),
        "o_totalprice", bands, "band_lo", "band_hi", bucketWidth = 5000L)
      .select(col("o_orderkey"), col("band_id"))
  }

  // SCD-2 dimension build: the q140 changelog (with event times = base +
  // seq days) materialized as per-version validity intervals; deletes
  // close the prior version and emit nothing; resurrections open a new
  // current version.
  def q151Scd2(s: SparkSession, d: String): DataFrame = {
    val snap = Tables.documents(s, d).select("doc_id", "text")
    val rev2 = snap.filter(pmod(col("doc_id"), lit(5)) === 0)
      .withColumn("text", concat(col("text"), lit(" (rev 2)")))
      .withColumn("op", lit("upsert")).withColumn("seq", lit(1L))
    val dels = snap.filter(pmod(col("doc_id"), lit(7)) === 0)
      .withColumn("op", lit("delete")).withColumn("seq", lit(2L))
    val ins = snap.filter(pmod(col("doc_id"), lit(11)) === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
      .withColumn("op", lit("upsert")).withColumn("seq", lit(1L))
    val rev3 = snap.filter(pmod(col("doc_id"), lit(35)) === 0)
      .withColumn("text", concat(col("text"), lit(" (rev 3)")))
      .withColumn("op", lit("upsert")).withColumn("seq", lit(3L))
    val changes = rev2.unionByName(dels).unionByName(ins).unionByName(rev3)
      .withColumn("ts", timestamp_seconds(lit(1704067200L) + col("seq") * 86400L))
    Relational.scd2(changes, Seq("doc_id"), "op", "seq", "ts")
      .select(col("doc_id"), md5(col("text")).as("text_md5"),
        TimeFunctions.canonical(col("valid_from")).as("valid_from"),
        TimeFunctions.canonical(col("valid_to")).as("valid_to"),
        col("is_current"))
  }

  // Exact z-score anomaly flags: spend events vs the user's strictly
  // earlier 24-hour baseline, z-squared threshold 2.0 (z2centi 200),
  // 5-event minimum baseline — the integer cross-multiplied test, no
  // float stddev anywhere.
  def q154Anomalies(s: SparkSession, d: String): DataFrame =
    graft.operators.Events.anomalies(
        events(s, d).select(col("user_id"), col("event_id"), col("ts"),
          Portable.cents(col("value")).as("cents")),
        "user_id", "ts", "cents", "1 day", z2centi = 200L, minPrior = 5)
      .select(col("user_id"), col("event_id"), col("n_prior"), col("is_anomaly"))

  // Data-quality expectation report over documents: three passing rules
  // (non-null text, n_chars consistency, key uniqueness), one failing
  // (lang allowlist excludes 'es') — both verdict classes in the gate.
  def q155Expectations(s: SparkSession, d: String): DataFrame =
    Relational.expectationReport(Tables.documents(s, d), Seq(
        "text_nonnull" -> col("text").isNotNull,
        "n_chars_consistent" -> (length(col("text")) === col("n_chars")),
        "lang_allowlisted" -> col("lang").isin("en", "de", "fr", "zh"),
        "id_nonnegative" -> (col("doc_id") >= 0)),
      uniqueKeys = Seq("doc_id"))

  // Market-basket co-occurrence: event types co-present within a user
  // SESSION (the q142 sessionization defines the basket) — "users who
  // viewed also purchased", support >= 3 sessions.
  def q158CoOccurrence(s: SparkSession, d: String): DataFrame = {
    val sess = graft.operators.Events.sessionize(events(s, d), "user_id", "ts",
      "30 minutes", Seq(col("event_id")))
    graft.operators.Events.coOccurrence(
      sess.withColumn("_sess",
        concat_ws("#", col("user_id").cast("string"), col("session_seq").cast("string"))),
      "_sess", "event_type", minGroups = 3)
  }

  // Association rules over the q158 session fixture: directed
  // (antecedent -> consequent) confidence and lift in exact integer ppm.
  def q167AssociationRules(s: SparkSession, d: String): DataFrame = {
    val sess = graft.operators.Events.sessionize(events(s, d), "user_id", "ts",
      "30 minutes", Seq(col("event_id")))
    graft.operators.Events.associationRules(
      sess.withColumn("_sess",
        concat_ws("#", col("user_id").cast("string"), col("session_seq").cast("string"))),
      "_sess", "event_type", minGroups = 3)
  }

  // As-of join with a lookback tolerance (pandas merge_asof semantics):
  // q23's enrichment, but a stale latest order no longer counts as
  // context. The 8400-day bound sits at the fixture's median
  // event-to-order gap (events 2024, orders 1995-2001), so the gate
  // exercises BOTH arms: ~half the events keep their match, half null.
  def q168AsofTolerance(s: SparkSession, d: String): DataFrame = {
    val e = events(s, d)
    val o = Tables.orders(s, d)
    Relational.asofJoinBackward(e, o, "user_id", "o_custkey", "ts", "o_orderdate",
        rightTiebreak = Some("o_orderkey"), tolerance = Some("8400 days"))
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n_events"),
        count(col("_asof.o_orderkey")).as("n_matched"),
        sum(col("_asof.o_orderkey")).as("sum_matched_orderkey"))
  }

  // One-sided CUSUM upward-drift flags over per-user event values
  // (cents): Page's test in exact integer units via the distributed
  // prefix-min identity.
  def q169Cusum(s: SparkSession, d: String): DataFrame =
    graft.operators.Events.cusumChangepoints(
      events(s, d).withColumn("cents", Portable.cents(col("value")))
        .select("user_id", "event_id", "ts", "cents"),
      "user_id", "ts", "cents",
      target = 5000L, slack = 1000L, threshold = 20000L,
      tiebreak = Seq(col("event_id")))
      .select(col("user_id"), col("event_id"), col("cusum"), col("is_change"))

  // First-order Markov transition counts over per-user event streams:
  // the |types|^2 navigation matrix.
  def q159Transitions(s: SparkSession, d: String): DataFrame =
    graft.operators.Events.transitionMatrix(events(s, d), "user_id", "ts",
      "event_type", Seq(col("event_id")))

  // Concurrency sweep over session intervals [first event, last event +
  // gap): how many sessions are simultaneously active at every change
  // instant — the capacity-planning view of the q142 sessionization.
  def q161Concurrency(s: SparkSession, d: String): DataFrame = {
    val sess = graft.operators.Events.sessionize(events(s, d), "user_id", "ts",
        "30 minutes", Seq(col("event_id")))
      .groupBy(col("user_id"), col("session_seq"))
      .agg(min(col("ts")).as("s_start"),
        (max(col("ts")) + expr("INTERVAL 30 minutes")).as("s_end"))
    graft.operators.Events.concurrencySweep(sess, "s_start", "s_end")
      .select(TimeFunctions.canonical(col("ts")).as("ts"), col("n_active"))
  }

  // Week-over-week growth per event type: fixed 7-day UTC periods,
  // previous period by equi join (gaps yield NULL, the BI convention),
  // exact ppm growth.
  def q163PeriodOverPeriod(s: SparkSession, d: String): DataFrame =
    graft.operators.Events.periodOverPeriod(
      events(s, d).withColumn("cents", Portable.cents(col("value"))),
      "event_type", "ts", "cents", periodDays = 7)

  // Pareto / ABC revenue classification of customers (A < 70% cum share,
  // B < 90%, C rest) — the global descending cumulative share via the
  // distributed prefix sum, exact integer cross-multiplied cuts.
  def q164Pareto(s: SparkSession, d: String): DataFrame =
    Relational.paretoClasses(
      Tables.orders(s, d).withColumn("cents", Portable.cents(col("o_totalprice"))),
      "o_custkey", "cents", Seq("A" -> 70, "B" -> 90, "C" -> 100))

  // Key-skew profile over (user, event type): the top-10 hottest keys +
  // the order-of-magnitude histogram — the pre-shuffle diagnostic for
  // broadcast/salt/AQE decisions.
  def q153KeySkew(s: SparkSession, d: String): DataFrame =
    Relational.keySkewProfile(events(s, d), Seq("user_id", "event_type"), topK = 10)

  // k-anonymity by bottom-up generalization over customer
  // quasi-identifiers (segment, account-balance band, nation bucket):
  // every published combination covers >= 5 customers, rarer
  // combinations progressively masked from the most specific column —
  // parameters chosen so all generalization levels appear at sf0.01.
  def q130KAnonymity(s: SparkSession, d: String): DataFrame = {
    val cust = Tables.customer(s, d).select(
      col("c_mktsegment"),
      floor(col("c_acctbal") / 2000).cast("long").as("bal_band"),
      pmod(col("c_nationkey"), lit(5)).as("nat_mod"))
    Relational.kAnonymize(cust, Seq("c_mktsegment", "bal_band", "nat_mod"), k = 5)
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_scan_filter_project" -> q01ScanFilterProject,
    "q79_fuzzy_join" -> q79FuzzyJoin,
    "q128_window_analytics" -> q128WindowAnalytics,
    "q129_snapshot_diff" -> q129SnapshotDiff,
    "q140_apply_changes" -> q140ApplyChanges,
    "q142_sessionize" -> q142Sessionize,
    "q143_funnel" -> q143Funnel,
    "q166_funnel_universe" -> q166FunnelUniverse,
    "q144_retention" -> q144Retention,
    "q145_gap_fill" -> q145GapFill,
    "q147_rolling_agg" -> q147RollingAgg,
    "q149_analytics_mart" -> q149AnalyticsMart,
    "q150_range_join" -> q150RangeJoin,
    "q151_scd2" -> q151Scd2,
    "q153_key_skew" -> q153KeySkew,
    "q154_anomalies" -> q154Anomalies,
    "q155_expectations" -> q155Expectations,
    "q161_concurrency" -> q161Concurrency,
    "q163_period_over_period" -> q163PeriodOverPeriod,
    "q164_pareto" -> q164Pareto,
    "q158_cooccurrence" -> q158CoOccurrence,
    "q167_association_rules" -> q167AssociationRules,
    "q168_asof_tolerance" -> q168AsofTolerance,
    "q169_cusum" -> q169Cusum,
    "q171_next_event_horizon" -> q171NextEventHorizon,
    "q159_transitions" -> q159Transitions,
    "q130_k_anonymity" -> q130KAnonymity,
    "q02_filter_predicates" -> q02FilterPredicates,
    "q03_agg_global" -> q03AggGlobal,
    "q04_agg_group" -> q04AggGroup,
    "q05_window_tumbling" -> q05WindowTumbling,
    "q06_window_hopping" -> q06WindowHopping,
    "q07_session_window" -> q07SessionWindow,
    "q08_join_star" -> q08JoinStar,
    "q09_join_enrich" -> q09JoinEnrich,
    "q10_latest_by_key" -> q10LatestByKey,
    "q11_topk_per_group" -> q11TopKPerGroup,
    "q12_order_limit" -> q12OrderLimit,
    "q13_setops" -> q13SetOps,
    "q14_anti_join" -> q14AntiJoin,
    "q15_semi_join" -> q15SemiJoin,
    "q16_string_funcs" -> q16StringFuncs,
    "q17_datetime_funcs" -> q17DatetimeFuncs,
    "q18_math_funcs" -> q18MathFuncs,
    "q19_geo_haversine" -> q19GeoHaversine,
    "q20_json" -> q20Json,
    "q21_rollup" -> q21Rollup,
    "q22_quantiles" -> q22Quantiles,
    "q23_asof_join" -> q23AsofJoin,
    "q160_asof_forward" -> q160AsofForward,
    "q24_format_conv" -> q24FormatConv,
    "q25_avro_roundtrip" -> q25AvroRoundtrip,
    "q26_nested_array" -> q26NestedArray,
    "q35_typed_moments" -> q35TypedMoments,
    "q36_interval_join" -> q36IntervalJoin,
    "q47_schemaless_json" -> q47SchemalessJson,
    "q48_salted_join" -> q48SaltedJoin,
    "q54_sketches" -> q54Sketches,
    "q54a_sketch_exact" -> q54aSketchExact)

  private val cents = (x: String) => s"CAST(round($x*100) AS BIGINT)"

  /** DuckDB `sum()` over integers returns HUGEINT (int128), which the
    * driver's pandas-side canonicalization stringifies instead of keeping
    * numeric — every integer sum in an oracle MUST be cast back to BIGINT
    * or the value hash can never match (round-1 lesson: the 10 hash
    * mismatches were exactly the queries with uncast integer sums). */
  private val sumL = (x: String) => s"CAST(sum($x) AS BIGINT)"

  /** q130 oracle: the leftover-recounting generalization ladder unrolled
    * as one CTE chain per level (masking from the LAST quasi column, the
    * operator's order). */
  private val q130OracleSql: String = {
    val cols = Seq("c_mktsegment", "bal_band", "nat_mod")
    val k = 5
    val base =
      """SELECT coalesce(CAST(c_mktsegment AS VARCHAR), ' ') AS c_mktsegment,
                coalesce(CAST(CAST(floor(c_acctbal/2000) AS BIGINT) AS VARCHAR), ' ') AS bal_band,
                coalesce(CAST(c_nationkey % 5 AS VARCHAR), ' ') AS nat_mod
         FROM customer"""
    val part = cols.mkString(", ")
    val ctes = new scala.collection.mutable.ArrayBuffer[String]
    ctes += s"l0 AS ($base)"
    for (level <- 0 to cols.size) {
      if (level > 0) {
        val sel = cols.zipWithIndex.map { case (c, i) =>
          if (i < cols.size - level) c else s"'*' AS $c"
        }.mkString(", ")
        ctes += s"l$level AS (SELECT $sel FROM r${level - 1})"
      }
      ctes += s"""p$level AS (SELECT *, $level AS anon_level FROM l$level
        QUALIFY count(*) OVER (PARTITION BY $part) >= $k)"""
      if (level < cols.size)
        ctes += s"""r$level AS (SELECT * FROM l$level
          QUALIFY count(*) OVER (PARTITION BY $part) < $k)"""
    }
    val union = (0 to cols.size).map(l => s"SELECT * FROM p$l").mkString(" UNION ALL ")
    s"WITH ${ctes.mkString(",\n")}\n$union"
  }

  /** q145 oracle: the same grid/carry/lerp arithmetic — slot = floor
    * division of epoch micros, carries via IGNORE NULLS windows, lerp
    * via the exact (num − pmod(num, den)) / den floor division. */
  private val q145OracleSql: String = {
    val step = 21600000000L // 6 hours in micros
    s"""WITH obs AS (
          SELECT user_id, (epoch_us(ts::TIMESTAMP) // $step) * $step AS slot,
            CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS val
          FROM events GROUP BY 1, 2),
        spine AS (
          SELECT user_id, unnest(range(lo, hi + $step, $step)) AS slot
          FROM (SELECT user_id, min(slot) AS lo, max(slot) AS hi
                FROM obs GROUP BY 1)),
        j AS (SELECT s.user_id, s.slot, o.val, s.slot // $step AS i
              FROM spine s LEFT JOIN obs o ON s.user_id = o.user_id AND s.slot = o.slot),
        w AS (SELECT user_id, slot, val, i,
            CASE WHEN val IS NOT NULL THEN 1 ELSE 0 END AS observed,
            last_value(val IGNORE NULLS) OVER back AS locf,
            first_value(val IGNORE NULLS) OVER fwd AS nocb,
            last_value(CASE WHEN val IS NOT NULL THEN i END IGNORE NULLS) OVER back AS li,
            first_value(CASE WHEN val IS NOT NULL THEN i END IGNORE NULLS) OVER fwd AS ni
          FROM j
          WINDOW back AS (PARTITION BY user_id ORDER BY slot
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                 fwd AS (PARTITION BY user_id ORDER BY slot
                  ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
        SELECT user_id,
          strftime(make_timestamp(slot), '%Y-%m-%d %H:%M:%S') AS slot_ts,
          CAST(observed AS INT) AS observed, locf, nocb,
          CASE WHEN observed = 1 THEN val * 1000000
               WHEN locf IS NULL THEN nocb * 1000000
               WHEN nocb IS NULL THEN locf * 1000000
               ELSE locf * 1000000 + CAST((
                 ((nocb - locf) * 1000000 * (i - li)) -
                 ((((nocb - locf) * 1000000 * (i - li)) % (ni - li) + (ni - li)) % (ni - li))
               ) / (ni - li) AS BIGINT) END AS interp_micro
        FROM w"""
  }

  /** The q155 rule-counter CTEs (`n`, `rules`) — shared between the
    * batch oracle (which appends the uniqueness row) and the streaming
    * twin q156 (rules only: distinct aggregation is unsupported on
    * streams). */
  private[queries] val q155RuleCtesSql: String =
    """n AS (SELECT count(*) AS n_rows FROM documents),
       rules AS (
         SELECT 'text_nonnull' AS rule,
           CAST(sum(CASE WHEN text IS NOT NULL THEN 0 ELSE 1 END) AS BIGINT) AS n_violations
         FROM documents
         UNION ALL SELECT 'n_chars_consistent',
           CAST(sum(CASE WHEN length(text) = n_chars THEN 0 ELSE 1 END) AS BIGINT)
         FROM documents
         UNION ALL SELECT 'lang_allowlisted',
           CAST(sum(CASE WHEN lang IN ('en','de','fr','zh') THEN 0 ELSE 1 END) AS BIGINT)
         FROM documents
         UNION ALL SELECT 'id_nonnegative',
           CAST(sum(CASE WHEN doc_id >= 0 THEN 0 ELSE 1 END) AS BIGINT)
         FROM documents)"""

  /** The streaming twin's oracle: q155's rule rows verbatim, no
    * uniqueness row. */
  private[queries] val q156OracleSql: String =
    s"""WITH $q155RuleCtesSql
        SELECT rule, n_violations, n.n_rows,
          CAST(n_violations = 0 AS INT) AS pass
        FROM rules CROSS JOIN n"""

  /** q140 oracle (shared VERBATIM with the streaming twin q141): the
    * same deterministic changelog, net change = latest per key, merge =
    * untouched snapshot rows + surviving upserts. */
  private[queries] val q140OracleSql: String =
    """WITH snap AS (SELECT doc_id, text FROM documents),
       changes AS (
         SELECT doc_id, text || ' (rev 2)' AS text, 'upsert' AS op, 1 AS seq
         FROM snap WHERE doc_id % 5 = 0
         UNION ALL SELECT doc_id, text, 'delete', 2 FROM snap WHERE doc_id % 7 = 0
         UNION ALL SELECT doc_id + 1000000, text, 'upsert', 1 FROM snap WHERE doc_id % 11 = 0
         UNION ALL SELECT doc_id, text || ' (rev 3)', 'upsert', 3 FROM snap WHERE doc_id % 35 = 0),
       net AS (SELECT * FROM changes
         QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY seq DESC) = 1),
       merged AS (
         SELECT s.doc_id, s.text FROM snap s
         WHERE NOT EXISTS (SELECT 1 FROM net n WHERE n.doc_id = s.doc_id)
         UNION ALL
         SELECT doc_id, text FROM net WHERE op <> 'delete')
       SELECT doc_id, md5(text) AS text_md5 FROM merged"""

  val oracles: Map[String, String] = Map(
    "q128_window_analytics" ->
      s"""SELECT o_orderkey, o_custkey,
            row_number() OVER chrono AS seq,
            date_diff('day', lag(CAST(o_orderdate AS DATE)) OVER chrono,
                      CAST(o_orderdate AS DATE)) AS gap_days,
            CAST(sum(${cents("o_totalprice")}) OVER run AS BIGINT) AS run_cents,
            ntile(4) OVER spend AS spend_quartile
          FROM orders
          WINDOW chrono AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
                 run AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                 spend AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)""",
    "q129_snapshot_diff" ->
      s"""WITH o AS (
            SELECT doc_id, md5(concat_ws('|', coalesce(text, ' '))) AS old_fp
            FROM documents),
          kept AS (
            SELECT doc_id,
              CASE WHEN doc_id % 5 = 0 THEN text || ' (rev 2)' ELSE text END AS text
            FROM documents WHERE doc_id % 7 <> 0),
          added AS (
            SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id % 11 = 0),
          n AS (
            SELECT doc_id, md5(concat_ws('|', coalesce(text, ' '))) AS new_fp
            FROM (SELECT * FROM kept UNION ALL SELECT * FROM added)),
          j AS (SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
                  CASE WHEN o.doc_id IS NULL THEN 'added'
                       WHEN n.doc_id IS NULL THEN 'removed'
                       WHEN old_fp <> new_fp THEN 'changed' END AS change,
                  old_fp, new_fp
                FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id)
          SELECT * FROM j WHERE change IS NOT NULL""",
    "q130_k_anonymity" -> q130OracleSql,
    "q140_apply_changes" -> q140OracleSql,
    "q142_sessionize" ->
      """WITH e AS (SELECT user_id, event_id, ts::TIMESTAMP AS t FROM events),
         f AS (SELECT user_id, event_id, t,
           CASE WHEN lag(t) OVER w IS NULL
                  OR epoch_us(t) - epoch_us(lag(t) OVER w) > 1800000000 THEN 1 ELSE 0 END AS is_new
           FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id))
         SELECT user_id, event_id,
           CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY t, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS INT) AS session_seq
         FROM f""",
    "q143_funnel" ->
      """WITH e AS (SELECT user_id, ts::TIMESTAMP AS t, event_type FROM events),
         s1 AS (SELECT user_id, min(t) AS t1 FROM e WHERE event_type = 'view' GROUP BY 1),
         s2 AS (SELECT s1.user_id, t1,
             min(CASE WHEN e.t > t1
                       AND epoch_us(e.t) <= epoch_us(t1) + 604800000000 THEN e.t END) AS t2
           FROM s1 LEFT JOIN e ON e.user_id = s1.user_id AND e.event_type = 'click'
           GROUP BY 1, 2),
         s3 AS (SELECT s2.user_id, t1, t2,
             min(CASE WHEN e.t > t2
                       AND epoch_us(e.t) <= epoch_us(t1) + 604800000000 THEN e.t END) AS t3
           FROM s2 LEFT JOIN e ON e.user_id = s2.user_id AND e.event_type = 'purchase'
           GROUP BY 1, 2, 3)
         SELECT user_id,
           strftime(t1, '%Y-%m-%d %H:%M:%S') AS step_1_ts,
           strftime(t2, '%Y-%m-%d %H:%M:%S') AS step_2_ts,
           strftime(t3, '%Y-%m-%d %H:%M:%S') AS step_3_ts,
           (CASE WHEN t1 IS NOT NULL THEN 1 ELSE 0 END +
            CASE WHEN t2 IS NOT NULL THEN 1 ELSE 0 END +
            CASE WHEN t3 IS NOT NULL THEN 1 ELSE 0 END) AS furthest_step
         FROM s3""",
    "q166_funnel_universe" ->
      """WITH e AS (SELECT user_id, ts::TIMESTAMP AS t, event_type FROM events),
         s1 AS (SELECT user_id, min(t) AS t1 FROM e WHERE event_type = 'view' GROUP BY 1),
         s2 AS (SELECT s1.user_id, t1,
             min(CASE WHEN e.t > t1
                       AND epoch_us(e.t) <= epoch_us(t1) + 604800000000 THEN e.t END) AS t2
           FROM s1 LEFT JOIN e ON e.user_id = s1.user_id AND e.event_type = 'click'
           GROUP BY 1, 2),
         s3 AS (SELECT s2.user_id, t1, t2,
             min(CASE WHEN e.t > t2
                       AND epoch_us(e.t) <= epoch_us(t1) + 604800000000 THEN e.t END) AS t3
           FROM s2 LEFT JOIN e ON e.user_id = s2.user_id AND e.event_type = 'purchase'
           GROUP BY 1, 2, 3),
         u AS (SELECT DISTINCT user_id FROM events)
         SELECT u.user_id,
           strftime(t1, '%Y-%m-%d %H:%M:%S') AS step_1_ts,
           strftime(t2, '%Y-%m-%d %H:%M:%S') AS step_2_ts,
           strftime(t3, '%Y-%m-%d %H:%M:%S') AS step_3_ts,
           coalesce(CASE WHEN t1 IS NOT NULL THEN 1 ELSE 0 END +
                    CASE WHEN t2 IS NOT NULL THEN 1 ELSE 0 END +
                    CASE WHEN t3 IS NOT NULL THEN 1 ELSE 0 END, 0) AS furthest_step
         FROM u LEFT JOIN s3 ON u.user_id = s3.user_id""",
    "q144_retention" ->
      """WITH a AS (SELECT DISTINCT user_id,
             date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) // 7 AS p
           FROM events),
         c AS (SELECT user_id, min(p) AS cohort_period FROM a GROUP BY 1)
         SELECT CAST(cohort_period AS BIGINT) AS cohort_period,
           CAST(a.p - cohort_period AS BIGINT) AS period_offset,
           count(*) AS n_active
         FROM a JOIN c USING (user_id) GROUP BY 1, 2""",
    "q145_gap_fill" -> q145OracleSql,
    "q155_expectations" ->
      s"""WITH $q155RuleCtesSql,
         allrules AS (SELECT * FROM rules
           UNION ALL SELECT 'unique(doc_id)',
             CAST(count(*) - count(DISTINCT doc_id) AS BIGINT)
           FROM documents)
         SELECT rule, n_violations, n.n_rows,
           CAST(n_violations = 0 AS INT) AS pass
         FROM allrules CROSS JOIN n""",
    "q163_period_over_period" ->
      """WITH t AS (SELECT event_type,
             date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) // 7 AS period,
             CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS total
           FROM events GROUP BY 1, 2)
         SELECT c.event_type, CAST(c.period AS BIGINT) AS period, c.total,
           p.total AS prev_total,
           CAST(c.total - coalesce(p.total, 0) AS BIGINT) AS delta,
           CASE WHEN p.total > 0 THEN CAST((
             (c.total - p.total) * 1000000 -
             ((((c.total - p.total) * 1000000) % p.total + p.total) % p.total)
           ) / p.total AS BIGINT) END AS growth_ppm
         FROM t c LEFT JOIN t p
           ON p.event_type = c.event_type AND p.period = c.period - 1""",
    "q164_pareto" ->
      """WITH t AS (SELECT o_custkey AS k,
             CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS total
           FROM orders GROUP BY 1),
         g AS (SELECT CAST(sum(total) AS BIGINT) AS grand FROM t),
         c AS (SELECT k, total,
             CAST(coalesce(sum(total) OVER (ORDER BY total DESC, k
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_before
           FROM t)
         SELECT k AS o_custkey, total, cum_before,
           CASE WHEN cum_before * 100 < 70 * grand THEN 'A'
                WHEN cum_before * 100 < 90 * grand THEN 'B'
                ELSE 'C' END AS abc_class
         FROM c CROSS JOIN g""",
    "q161_concurrency" ->
      """WITH e AS (SELECT user_id, event_id, ts::TIMESTAMP AS t FROM events),
         f AS (SELECT user_id, event_id, t,
             CASE WHEN lag(t) OVER w IS NULL
                    OR epoch_us(t) - epoch_us(lag(t) OVER w) > 1800000000 THEN 1 ELSE 0 END AS is_new
           FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)),
         sessed AS (SELECT user_id, t,
             sum(is_new) OVER (PARTITION BY user_id ORDER BY t, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
           FROM f),
         sess AS (SELECT user_id, session_seq, min(t) AS s,
             max(t) + INTERVAL 30 MINUTE AS en
           FROM sessed GROUP BY 1, 2),
         d AS (SELECT t, CAST(sum(dd) AS BIGINT) AS dd FROM (
             SELECT s AS t, 1 AS dd FROM sess
             UNION ALL SELECT en, -1 FROM sess) GROUP BY 1)
         SELECT strftime(t, '%Y-%m-%d %H:%M:%S') AS ts,
           CAST(sum(dd) OVER (ORDER BY t
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS n_active
         FROM d""",
    "q167_association_rules" ->
      """WITH e AS (SELECT user_id, event_id, ts::TIMESTAMP AS t, event_type FROM events),
         f AS (SELECT user_id, event_id, t, event_type,
             CASE WHEN lag(t) OVER w IS NULL
                    OR epoch_us(t) - epoch_us(lag(t) OVER w) > 1800000000 THEN 1 ELSE 0 END AS is_new
           FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)),
         sessed AS (SELECT CAST(user_id AS VARCHAR) || '#' ||
             CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY t, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS VARCHAR) AS g,
             event_type AS i
           FROM f),
         gi AS (SELECT DISTINCT g, i FROM sessed),
         tot AS (SELECT count(DISTINCT g) AS N FROM gi),
         ic AS (SELECT i, count(*) AS ni FROM gi GROUP BY 1),
         p AS (SELECT a.i AS antecedent, b.i AS consequent, count(*) AS n_both
           FROM gi a JOIN gi b ON a.g = b.g AND a.i <> b.i
           GROUP BY 1, 2 HAVING count(*) >= 3)
         SELECT antecedent, consequent, n_both,
           ia.ni AS n_ante, ib.ni AS n_cons,
           CAST(n_both * 1000000 // ia.ni AS BIGINT) AS confidence_ppm,
           CAST(CAST(n_both AS HUGEINT) * N * 1000000
             // (CAST(ia.ni AS HUGEINT) * ib.ni) AS BIGINT) AS lift_ppm
         FROM p JOIN ic ia ON ia.i = antecedent
                JOIN ic ib ON ib.i = consequent
                CROSS JOIN tot""",
    "q171_next_event_horizon" ->
      """WITH e AS (SELECT user_id, event_id, ts::TIMESTAMP AS t, event_type FROM events),
         p AS (SELECT user_id, event_id AS pid, ts::TIMESTAMP AS pt
               FROM events WHERE event_type = 'purchase'),
         m AS (
           SELECT e.event_id, e.event_type,
             min_by(p.pid, CAST(epoch_us(p.pt) AS HUGEINT) * 4294967296 + p.pid) AS matched
           FROM e LEFT JOIN p
             ON p.user_id = e.user_id AND p.pt >= e.t
              AND epoch_us(p.pt) <= epoch_us(e.t) + 86400000000
           GROUP BY e.event_id, e.event_type
         )
         SELECT event_type, count(*) AS n_events,
           count(matched) AS n_matched, CAST(sum(matched) AS BIGINT) AS sum_matched_event_id
         FROM m GROUP BY event_type""",
    "q168_asof_tolerance" ->
      """WITH m AS (
           SELECT e.event_id, e.event_type,
             max_by(o.o_orderkey,
               CAST(epoch(o.o_orderdate) AS BIGINT) * 4294967296 + o.o_orderkey) AS matched
           FROM events e LEFT JOIN orders o
             ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts::TIMESTAMP
              AND o.o_orderdate >= e.ts::TIMESTAMP - INTERVAL 8400 DAY
           GROUP BY e.event_id, e.event_type
         )
         SELECT event_type, count(*) AS n_events,
           count(matched) AS n_matched, CAST(sum(matched) AS BIGINT) AS sum_matched_orderkey
         FROM m GROUP BY event_type""",
    "q169_cusum" ->
      """WITH e AS (SELECT user_id, event_id, ts::TIMESTAMP AS t,
             CAST(round(value*100) AS BIGINT) AS cents FROM events),
         c AS (SELECT user_id, event_id, t, cents,
             coalesce(CAST(sum(cents - 6000) OVER w AS HUGEINT), 0) AS C
           FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
         s AS (SELECT user_id, event_id, cents,
             C - least(min(C) OVER w2, 0) AS S
           FROM c WINDOW w2 AS (PARTITION BY user_id ORDER BY t, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
         SELECT user_id, event_id, CAST(S AS BIGINT) AS cusum,
           CASE WHEN cents IS NULL THEN NULL
                WHEN S > 20000 THEN 1 ELSE 0 END AS is_change
         FROM s""",
    "q158_cooccurrence" ->
      """WITH e AS (SELECT user_id, event_id, ts::TIMESTAMP AS t, event_type FROM events),
         f AS (SELECT user_id, event_id, t, event_type,
             CASE WHEN lag(t) OVER w IS NULL
                    OR epoch_us(t) - epoch_us(lag(t) OVER w) > 1800000000 THEN 1 ELSE 0 END AS is_new
           FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)),
         sessed AS (SELECT CAST(user_id AS VARCHAR) || '#' ||
             CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY t, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS VARCHAR) AS g,
             event_type AS i
           FROM f),
         gi AS (SELECT DISTINCT g, i FROM sessed)
         SELECT a.i AS item_a, b.i AS item_b, count(*) AS n_groups
         FROM gi a JOIN gi b ON a.g = b.g AND a.i < b.i
         GROUP BY 1, 2 HAVING count(*) >= 3""",
    "q159_transitions" ->
      """WITH e AS (SELECT user_id, event_id, ts::TIMESTAMP AS t, event_type FROM events),
         l AS (SELECT event_type AS to_type,
             lag(event_type) OVER (PARTITION BY user_id ORDER BY t, event_id) AS from_type
           FROM e)
         SELECT from_type, to_type, count(*) AS n_transitions
         FROM l WHERE from_type IS NOT NULL GROUP BY 1, 2""",
    "q154_anomalies" ->
      """WITH e AS (SELECT user_id, event_id, ts::TIMESTAMP AS t,
             CAST(round(value*100) AS BIGINT) AS v FROM events),
         s AS (SELECT user_id, event_id, v,
             count(*) OVER w AS n_prior,
             CAST(coalesce(sum(v) OVER w, 0) AS BIGINT) AS sv,
             CAST(coalesce(sum(v*v) OVER w, 0) AS BIGINT) AS qv
           FROM e
           WINDOW w AS (PARTITION BY user_id ORDER BY t
             RANGE BETWEEN INTERVAL 1 DAY PRECEDING
                       AND INTERVAL 1 MICROSECOND PRECEDING))
         SELECT user_id, event_id, n_prior,
           CAST(n_prior >= 5 AND
             100 * (CAST(v AS HUGEINT) * n_prior - sv)
                 * (CAST(v AS HUGEINT) * n_prior - sv)
             > 200 * (CAST(n_prior AS HUGEINT) * qv - CAST(sv AS HUGEINT) * sv)
           AS INT) AS is_anomaly
         FROM s""",
    "q153_key_skew" ->
      """WITH c AS (
           SELECT CAST(user_id AS VARCHAR) || '|' || event_type AS k,
             count(*) AS n
           FROM events GROUP BY user_id, event_type),
         hot AS (
           SELECT 'hot' AS kind,
             CAST(row_number() OVER (ORDER BY n DESC, k) AS INT) AS ord,
             k AS key, CAST(1 AS BIGINT) AS n_keys, n AS n_rows
           FROM c
           QUALIFY row_number() OVER (ORDER BY n DESC, k) <= 10),
         hist AS (
           SELECT 'hist' AS kind,
             CAST(length(CAST(n AS VARCHAR)) AS INT) AS ord,
             CAST(NULL AS VARCHAR) AS key, count(*) AS n_keys,
             CAST(sum(n) AS BIGINT) AS n_rows
           FROM c GROUP BY 2)
         SELECT * FROM hot UNION ALL SELECT * FROM hist""",
    "q150_range_join" ->
      """WITH bands AS (
           SELECT CAST(i AS BIGINT) AS band_id, CAST(i*5000 AS BIGINT) AS lo,
             CAST(i*5000 + 8000 AS BIGINT) AS hi
           FROM (SELECT unnest(range(0, 120)) AS i))
         SELECT o_orderkey, band_id FROM orders JOIN bands
           ON o_totalprice >= lo AND o_totalprice < hi""",
    "q151_scd2" ->
      """WITH snap AS (SELECT doc_id, text FROM documents),
         changes AS (
           SELECT doc_id, text || ' (rev 2)' AS text, 'upsert' AS op, 1 AS seq
           FROM snap WHERE doc_id % 5 = 0
           UNION ALL SELECT doc_id, text, 'delete', 2 FROM snap WHERE doc_id % 7 = 0
           UNION ALL SELECT doc_id + 1000000, text, 'upsert', 1 FROM snap WHERE doc_id % 11 = 0
           UNION ALL SELECT doc_id, text || ' (rev 3)', 'upsert', 3 FROM snap WHERE doc_id % 35 = 0),
         stamped AS (SELECT *,
             make_timestamp(CAST(1704067200 + seq * 86400 AS BIGINT) * 1000000) AS ts
           FROM changes),
         versioned AS (SELECT doc_id, text, op, ts AS valid_from,
             lead(ts) OVER (PARTITION BY doc_id ORDER BY seq) AS valid_to
           FROM stamped)
         SELECT doc_id, md5(text) AS text_md5,
           strftime(valid_from, '%Y-%m-%d %H:%M:%S') AS valid_from,
           strftime(valid_to, '%Y-%m-%d %H:%M:%S') AS valid_to,
           CAST(valid_to IS NULL AS INT) AS is_current
         FROM versioned WHERE op <> 'delete'""",
    "q149_analytics_mart" ->
      """WITH e AS (SELECT user_id, event_id, ts::TIMESTAMP AS t, event_type,
             CAST(round(value*100) AS BIGINT) AS cents FROM events),
         f AS (SELECT user_id, event_id, t, cents,
             CASE WHEN lag(t) OVER w IS NULL
                    OR epoch_us(t) - epoch_us(lag(t) OVER w) > 1800000000 THEN 1 ELSE 0 END AS is_new
           FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)),
         sessed AS (SELECT user_id, cents,
             sum(is_new) OVER (PARTITION BY user_id ORDER BY t, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
           FROM f),
         sess AS (SELECT user_id, CAST(max(session_seq) AS INT) AS n_sessions,
             count(*) AS n_events, CAST(sum(cents) AS BIGINT) AS value_cents
           FROM sessed GROUP BY 1),
         s1 AS (SELECT user_id, min(t) AS t1 FROM e WHERE event_type = 'view' GROUP BY 1),
         s2 AS (SELECT s1.user_id, t1,
             min(CASE WHEN e.t > t1
                       AND epoch_us(e.t) <= epoch_us(t1) + 604800000000 THEN e.t END) AS t2
           FROM s1 LEFT JOIN e ON e.user_id = s1.user_id AND e.event_type = 'click'
           GROUP BY 1, 2),
         s3 AS (SELECT s2.user_id, t1, t2,
             min(CASE WHEN e.t > t2
                       AND epoch_us(e.t) <= epoch_us(t1) + 604800000000 THEN e.t END) AS t3
           FROM s2 LEFT JOIN e ON e.user_id = s2.user_id AND e.event_type = 'purchase'
           GROUP BY 1, 2, 3),
         fun AS (SELECT user_id,
             (CASE WHEN t1 IS NOT NULL THEN 1 ELSE 0 END +
              CASE WHEN t2 IS NOT NULL THEN 1 ELSE 0 END +
              CASE WHEN t3 IS NOT NULL THEN 1 ELSE 0 END) AS furthest_step
           FROM s3),
         roll AS (SELECT user_id,
             CAST(max(rs) AS BIGINT) AS peak_24h_cents
           FROM (SELECT user_id, sum(cents) OVER (PARTITION BY user_id ORDER BY t
                   RANGE BETWEEN INTERVAL 1 DAY PRECEDING AND CURRENT ROW) AS rs
                 FROM e)
           GROUP BY 1)
         SELECT sess.user_id, n_sessions, n_events, value_cents,
           coalesce(furthest_step, 0) AS furthest_step, peak_24h_cents
         FROM sess
         LEFT JOIN fun ON sess.user_id = fun.user_id
         JOIN roll ON sess.user_id = roll.user_id""",
    "q147_rolling_agg" ->
      """SELECT user_id, event_id,
           CAST(sum(cents) OVER w AS BIGINT) AS roll_sum,
           count(cents) OVER w AS roll_cnt
         FROM (SELECT user_id, event_id, ts::TIMESTAMP AS t,
                 CAST(round(value*100) AS BIGINT) AS cents FROM events)
         WINDOW w AS (PARTITION BY user_id ORDER BY t
           RANGE BETWEEN INTERVAL 1 DAY PRECEDING AND CURRENT ROW)""",
    "q79_fuzzy_join" ->
      """WITH dirty AS (
           SELECT c_custkey AS d_custkey, c_nationkey AS d_nationkey,
             c_custkey % 20 AS d_blk,
             substring(c_name, 1, CAST(c_custkey % 8 + 10 AS INT) - 1) || 'x' ||
             substring(c_name, CAST(c_custkey % 8 + 10 AS INT) + 1, 99) AS d_name
           FROM customer
         )
         SELECT c.c_custkey, d.d_custkey,
           CAST(levenshtein(c.c_name, d.d_name) AS INT) AS edit_dist
         FROM customer c JOIN dirty d
           ON c.c_nationkey = d.d_nationkey AND c.c_custkey % 20 = d.d_blk
         WHERE abs(length(c.c_name) - length(d.d_name)) <= 1
           AND levenshtein(c.c_name, d.d_name) <= 1""",
    "q01_scan_filter_project" ->
      s"""SELECT l_orderkey, l_linenumber, CAST(l_quantity AS BIGINT) AS qty,
          ${cents("l_extendedprice")} AS price_cents
          FROM lineitem
          WHERE l_shipdate < TIMESTAMP '1995-06-01' AND l_quantity < 10""",
    "q02_filter_predicates" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
         WHERE c_mktsegment IN ('BUILDING','AUTOMOBILE')
           AND c_acctbal BETWEEN 0 AND 5000 AND c_name LIKE '%9%'""",
    "q03_agg_global" ->
      s"""SELECT count(*) AS n_rows, count(DISTINCT l_orderkey) AS n_orders,
          CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
          ${sumL(cents("l_extendedprice"))} AS sum_price_cents,
          min(${cents("l_extendedprice")}) AS min_price_cents,
          max(${cents("l_extendedprice")}) AS max_price_cents
          FROM lineitem""",
    "q04_agg_group" ->
      s"""SELECT l_returnflag, l_linestatus,
          CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
          ${sumL(cents("l_extendedprice"))} AS sum_base_cents,
          ${sumL(cents("l_extendedprice*(1-l_discount)"))} AS sum_disc_cents,
          count(*) AS count_order,
          CAST(sum(l_quantity) AS DOUBLE)/CAST(count(*) AS DOUBLE) AS avg_qty
          FROM lineitem GROUP BY l_returnflag, l_linestatus""",
    "q05_window_tumbling" ->
      s"""SELECT strftime(time_bucket(INTERVAL 10 MINUTE, ts::TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS window_start,
          event_type, count(*) AS n, ${sumL(cents("value"))} AS value_cents
          FROM events GROUP BY 1, 2""",
    "q06_window_hopping" ->
      """SELECT strftime(time_bucket(INTERVAL 5 MINUTE, ts::TIMESTAMP) - k * INTERVAL 5 MINUTE, '%Y-%m-%d %H:%M:%S') AS window_start,
         event_type, count(*) AS n
         FROM events CROSS JOIN (SELECT unnest([0,1]) AS k) offs
         GROUP BY 1, 2""",
    "q07_session_window" ->
      s"""WITH e AS (
            SELECT user_id, date_trunc('second', ts::TIMESTAMP) AS t, value FROM events
          ), flagged AS (
            SELECT user_id, t, value,
              -- Spark session_window MERGES events exactly gap apart
              -- (probe: [00:00, 00:05] with 5-min gap -> ONE session
              -- ending 00:10), so a new session needs STRICTLY > gap.
              CASE WHEN lag(t) OVER w IS NULL
                     OR t > lag(t) OVER w + INTERVAL 5 MINUTE THEN 1 ELSE 0 END AS is_new
            FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t)
          ), sess AS (
            SELECT user_id, t, value,
              sum(is_new) OVER (PARTITION BY user_id ORDER BY t
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
            FROM flagged
          )
          SELECT user_id,
            strftime(min(t), '%Y-%m-%d %H:%M:%S') AS session_start,
            strftime(max(t) + INTERVAL 5 MINUTE, '%Y-%m-%d %H:%M:%S') AS session_end,
            count(*) AS n, ${sumL(cents("value"))} AS value_cents
          FROM sess GROUP BY user_id, sid""",
    "q08_join_star" ->
      s"""SELECT n_name,
          ${sumL(cents("l_extendedprice*(1-l_discount)"))} AS revenue_cents,
          count(*) AS n_items
          FROM lineitem
          JOIN orders ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          JOIN nation ON c_nationkey = n_nationkey
          JOIN region ON n_regionkey = r_regionkey
          WHERE r_name = 'ASIA' GROUP BY n_name""",
    "q09_join_enrich" ->
      s"""SELECT c_mktsegment, count(*) AS n, ${sumL(cents("value"))} AS value_cents
          FROM events LEFT JOIN customer ON user_id = c_custkey
          GROUP BY c_mktsegment""",
    "q10_latest_by_key" ->
      s"""SELECT user_id, event_id, event_type,
          strftime(date_trunc('second', ts::TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS ts_s,
          ${cents("value")} AS value_cents
          FROM events
          QUALIFY row_number() OVER (PARTITION BY user_id
            ORDER BY date_trunc('second', ts::TIMESTAMP) DESC, event_id DESC) = 1""",
    "q11_topk_per_group" ->
      s"""SELECT o_orderpriority, o_orderkey, ${cents("o_totalprice")} AS total_cents
          FROM orders
          QUALIFY row_number() OVER (PARTITION BY o_orderpriority
            ORDER BY o_totalprice DESC, o_orderkey) <= 3""",
    "q12_order_limit" ->
      s"""SELECT l_orderkey, l_linenumber, ${cents("l_extendedprice")} AS price_cents
          FROM lineitem
          ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 100""",
    "q13_setops" ->
      """WITH a AS (SELECT p_partkey, p_brand, p_size FROM part WHERE p_size < 10),
         b AS (SELECT p_partkey, p_brand, p_size FROM part WHERE p_brand = 'Brand#13')
         SELECT * FROM (SELECT * FROM a UNION SELECT * FROM b)
         EXCEPT (SELECT * FROM a INTERSECT SELECT * FROM b)""",
    "q14_anti_join" ->
      """SELECT c_mktsegment, count(*) AS n_customers_no_orders FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
         GROUP BY c_mktsegment""",
    "q15_semi_join" ->
      """SELECT s_nationkey, count(*) AS n_suppliers FROM supplier
         WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_suppkey = s_suppkey)
         GROUP BY s_nationkey""",
    "q16_string_funcs" ->
      """SELECT c_custkey,
         regexp_extract(c_name, '([0-9]+)', 1) AS digits,
         upper(c_name) AS upper_name,
         substring(c_name, 1, 8) AS prefix8,
         concat_ws('|', c_mktsegment, c_name) AS joined,
         length(c_name) AS name_len,
         string_split(c_name, '#')[1] AS name_head
         FROM customer WHERE c_custkey < 200""",
    "q17_datetime_funcs" ->
      """SELECT event_id,
         CAST(floor(epoch(ts::TIMESTAMP)) AS BIGINT) AS epoch_s,
         year(ts::TIMESTAMP) AS y, month(ts::TIMESTAMP) AS m,
         day(ts::TIMESTAMP) AS dom, hour(ts::TIMESTAMP) AS h,
         isodow(ts::TIMESTAMP) AS isodow,
         strftime(date_trunc('hour', ts::TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS hour_start,
         strftime(to_timestamp(CAST(floor(epoch(ts::TIMESTAMP)) AS BIGINT))::TIMESTAMP, '%Y-%m-%d %H:%M:%S') AS roundtrip_ms
         FROM events WHERE event_id < 500""",
    "q18_math_funcs" ->
      """SELECT l_orderkey, l_linenumber,
         abs(l_discount - 0.05) AS abs_d,
         CAST(ceil(l_extendedprice) AS BIGINT) AS ceil_price,
         CAST(floor(l_extendedprice) AS BIGINT) AS floor_price,
         round(l_extendedprice, 1) AS round1,
         sqrt(l_quantity) AS sqrt_qty,
         l_orderkey % 7 AS mod7,
         greatest(l_tax, l_discount) AS gr,
         least(l_tax, l_discount) AS le
         FROM lineitem WHERE l_orderkey < 100""",
    "q19_geo_haversine" ->
      """WITH c AS (SELECT c_custkey,
           (c_custkey % 17000)/100.0 - 85.0 AS lat1,
           (c_custkey*7 % 36000)/100.0 - 180.0 AS lon1,
           (c_nationkey*700 % 17000)/100.0 - 85.0 AS lat2,
           (c_nationkey*1400 % 36000)/100.0 - 180.0 AS lon2
         FROM customer)
         SELECT c_custkey, CAST(round(2 * 6371000.0 * asin(sqrt(
           pow(sin(radians(lat2-lat1)/2),2) +
           cos(radians(lat1))*cos(radians(lat2))*pow(sin(radians(lon2-lon1)/2),2)
         ))) AS BIGINT) AS dist_m FROM c""",
    "q20_json" ->
      """SELECT CAST(json_extract_string(props,'$.k') AS INT) % 10 AS k_mod,
         count(*) AS n, CAST(sum(CAST(json_extract_string(props,'$.k') AS INT)) AS BIGINT) AS sum_k
         FROM events GROUP BY 1""",
    "q21_rollup" ->
      s"""SELECT coalesce(c_mktsegment,'ALL') AS segment, count(*) AS n,
          ${sumL(cents("c_acctbal"))} AS bal_cents
          FROM customer GROUP BY ROLLUP(c_mktsegment)""",
    "q22_quantiles" ->
      """SELECT l_returnflag,
         quantile_cont(l_quantity, 0.25) AS q25,
         quantile_cont(l_quantity, 0.5) AS q50,
         quantile_cont(l_quantity, 0.75) AS q75
         FROM lineitem GROUP BY l_returnflag""",
    // SQL ASOF JOIN leaves equal-timestamp matches unspecified (a customer
    // with two same-date orders), so the oracle states the deterministic
    // definition directly: max by (orderdate, orderkey) — lexicographic
    // list comparison — among orders at-or-before the event.
    "q160_asof_forward" ->
      """WITH m AS (
           SELECT e.event_id, e.event_type,
             min_by(o.o_orderkey,
               CAST(epoch(o.o_orderdate) AS BIGINT) * 4294967296 + o.o_orderkey) AS matched
           FROM events e LEFT JOIN orders o
             ON o.o_custkey = e.user_id AND o.o_orderdate >= e.ts::TIMESTAMP
           GROUP BY e.event_id, e.event_type
         )
         SELECT event_type, count(*) AS n_events,
           count(matched) AS n_matched, CAST(sum(matched) AS BIGINT) AS sum_matched_orderkey
         FROM m GROUP BY event_type""",
    "q23_asof_join" ->
      """WITH m AS (
           SELECT e.event_id, e.event_type,
             max_by(o.o_orderkey,
               CAST(epoch(o.o_orderdate) AS BIGINT) * 4294967296 + o.o_orderkey) AS matched
           FROM events e LEFT JOIN orders o
             ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts::TIMESTAMP
           GROUP BY e.event_id, e.event_type
         )
         SELECT event_type, count(*) AS n_events,
           count(matched) AS n_matched, CAST(sum(matched) AS BIGINT) AS sum_matched_orderkey
         FROM m GROUP BY event_type""",
    "q24_format_conv" ->
      """SELECT doc_id,
         to_base64(substring(text,1,12)::BLOB) AS b64,
         hex(substring(text,1,6)::BLOB) AS hex6,
         md5(text) AS text_md5,
         substring(from_base64(to_base64(text::BLOB))::VARCHAR, 1, 20) AS roundtrip20
         FROM documents""",
    "q25_avro_roundtrip" ->
      """SELECT c_custkey, c_name, CAST(NULL AS VARCHAR) AS c_note FROM customer""",
    "q26_nested_array" ->
      """WITH c AS (SELECT c_custkey,
           (c_custkey % 17000)/100.0 - 85.0 AS lat1,
           (c_custkey*7 % 36000)/100.0 - 180.0 AS lon1,
           (c_nationkey*700 % 17000)/100.0 - 85.0 AS lat2,
           (c_nationkey*1400 % 36000)/100.0 - 180.0 AS lon2
         FROM customer)
         SELECT c_custkey, 0 AS pos, lat1 AS lat, lon1 AS lon, lat1 AS first_lat FROM c
         UNION ALL
         SELECT c_custkey, 1 AS pos, lat2 AS lat, lon2 AS lon, lat1 AS first_lat FROM c""",
    "q36_interval_join" ->
      """SELECT a.event_type AS type_a, count(*) AS n_matches,
         count(DISTINCT a.event_id) AS n_events_matched,
         CAST(sum(b.event_id) AS BIGINT) AS sum_matched_ids
         FROM events a JOIN events b
           ON a.user_id = b.user_id AND a.event_id <> b.event_id
          AND b.ts::TIMESTAMP >= a.ts::TIMESTAMP - INTERVAL 10 MINUTE
          AND b.ts::TIMESTAMP <= a.ts::TIMESTAMP + INTERVAL 10 MINUTE
         GROUP BY a.event_type""",
    "q47_schemaless_json" ->
      """SELECT event_type, count(*) AS n,
         CAST(sum(CAST(json_extract_string(props,'$.k') AS BIGINT)) AS BIGINT) AS sum_k,
         min(CAST(json_extract_string(props,'$.k') AS BIGINT)) AS min_k,
         max(CAST(json_extract_string(props,'$.k') AS BIGINT)) AS max_k
         FROM events GROUP BY event_type""",
    "q48_salted_join" ->
      s"""SELECT s_nationkey, count(*) AS n,
          ${sumL(cents("l_extendedprice"))} AS price_cents
          FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
          GROUP BY s_nationkey""",
    // q54 stays approximate → rows-only; q54a is its driver-green audit:
    // exact percentiles/distincts hash-gated, sketch accuracy as flags.
    "q54a_sketch_exact" ->
      s"""SELECT l_returnflag,
         quantile_cont(${cents("l_extendedprice")}, 0.5) AS p50_cents,
         round(quantile_cont(${cents("l_extendedprice")}, 0.95), 3) AS p95_cents,
         CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts,
         CAST(1 AS INT) AS p50_in_band,
         CAST(1 AS INT) AS p95_in_band,
         CAST(1 AS INT) AS parts_within_15pct
         FROM lineitem GROUP BY l_returnflag""",
    // q35's formula is replicated exactly:
    // integer sums, then the same fixed sequence of double divisions.
    "q35_typed_moments" ->
      """WITH s AS (
           SELECT l_returnflag, count(*) AS n,
             CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sm,
             CAST(sum(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS BIGINT) AS sq
           FROM lineitem GROUP BY l_returnflag
         )
         SELECT l_returnflag, n,
           round(CAST(sm AS DOUBLE) / CAST(n AS DOUBLE), 6) AS mean_qty,
           round((CAST(sq AS DOUBLE) - CAST(sm AS DOUBLE) * CAST(sm AS DOUBLE) / CAST(n AS DOUBLE))
                 / (CAST(n AS DOUBLE) - 1.0), 6) AS var_qty
         FROM s""")
}
