package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class EventsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("sessionize: splits strictly past the gap, merges at exactly the gap, per-key numbering") {
    val e = Seq(
      (1L, 10L, ts("2024-01-01 00:00:00")),
      (1L, 11L, ts("2024-01-01 00:30:00")), // exactly gap -> SAME session (q07 semantics)
      (1L, 12L, ts("2024-01-01 01:00:01")), // 1s past gap -> new session
      (1L, 13L, ts("2024-01-01 01:00:01")), // equal ts -> same session, any tie order
      (2L, 20L, ts("2024-01-01 00:00:00"))  // other key numbers independently
    ).toDF("user", "eid", "t")
    val out = Events.sessionize(e, "user", "t", "30 minutes", Seq(col("eid")))
      .select("eid", "session_seq")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(out == Map(10L -> 1, 11L -> 1, 12L -> 2, 13L -> 2, 20L -> 1), s"got $out")
  }

  test("funnelSteps: order enforced, horizon cuts, stalls null out, furthest counts") {
    val e = Seq(
      // u1 completes a->b->c in order
      (1L, "a", ts("2024-01-01 00:00:00")),
      (1L, "b", ts("2024-01-01 01:00:00")),
      (1L, "c", ts("2024-01-01 02:00:00")),
      // u2: b BEFORE a never counts; the later b does
      (2L, "b", ts("2024-01-01 00:00:00")),
      (2L, "a", ts("2024-01-01 01:00:00")),
      (2L, "b", ts("2024-01-01 03:00:00")),
      // u3: b lands past the 1-day horizon from a
      (3L, "a", ts("2024-01-01 00:00:00")),
      (3L, "b", ts("2024-01-02 00:00:01")),
      // u4 never does a -> absent from the output
      (4L, "c", ts("2024-01-01 00:00:00"))
    ).toDF("user", "ty", "t")
    val out = Events.funnelSteps(e, "user", "t", "ty", Seq("a", "b", "c"),
      Some("1 day"))
    assert(out.columns.toSeq ==
      Seq("user", "step_1_ts", "step_2_ts", "step_3_ts", "furthest_step"))
    val rows = out.collect().map(r => r.getLong(0) ->
      (r.getTimestamp(1), r.getTimestamp(2), r.getTimestamp(3), r.getInt(4))).toMap
    assert(rows.keySet == Set(1L, 2L, 3L), "only step-1 performers appear")
    assert(rows(1L)._4 == 3 && rows(1L)._3 == ts("2024-01-01 02:00:00"))
    assert(rows(2L)._4 == 2 && rows(2L)._2 == ts("2024-01-01 03:00:00"),
      "a step before step 1's time must not count")
    assert(rows(3L)._4 == 1 && rows(3L)._2 == null, "past-horizon step must not count")
    // without a horizon u3 converts on step 2
    val noH = Events.funnelSteps(e, "user", "t", "ty", Seq("a", "b"), None)
      .collect().map(r => r.getLong(0) -> r.getInt(3)).toMap
    assert(noH(3L) == 2)
    intercept[IllegalArgumentException] {
      Events.funnelSteps(e, "user", "t", "ty", Seq("a", "a"), None)
    }
  }

  test("retentionCohorts: first-activity cohort, offset 0 is cohort size, known matrix") {
    // period = 7 days from 1970-01-01; 2024-01-01 is day 19723 -> period 2817
    val e = Seq(
      (1L, ts("2024-01-01 12:00:00")), (1L, ts("2024-01-09 12:00:00")), // p, p+1
      (2L, ts("2024-01-02 00:00:00")),                                  // p only
      (3L, ts("2024-01-09 00:00:00")), (3L, ts("2024-01-09 23:00:00"))  // p+1 cohort, one period
    ).toDF("user", "t")
    val out = Events.retentionCohorts(e, "user", "t", periodDays = 7)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val p = 19723 / 7
    assert(out == Map(
      (p.toLong, 0L) -> 2L, (p.toLong, 1L) -> 1L, (p.toLong + 1, 0L) -> 1L), s"got $out")
  }

  test("rollingAgg: inclusive trailing range, equal-ts peers aggregate, per-key isolation") {
    val e = Seq(
      (1L, 10L, ts("2024-01-01 00:00:00"), 5L),
      (1L, 11L, ts("2024-01-02 00:00:00"), 7L),  // exactly 24h later: 10 still IN
      (1L, 12L, ts("2024-01-02 00:00:01"), 2L),  // 10 now out
      (1L, 13L, ts("2024-01-02 00:00:01"), 3L),  // equal ts: peer of 12 — both see both
      (2L, 20L, ts("2024-01-02 00:00:00"), 100L) // other key isolated
    ).toDF("user", "eid", "t", "v")
    val out = Events.rollingAgg(e, "user", "t", "v", "1 day")
      .collect().map(r => r.getLong(1) -> ((r.getLong(4), r.getLong(5)))).toMap
    assert(out(10L) == ((5L, 1L)))
    assert(out(11L) == ((12L, 2L)), "the exactly-window-old event is inclusive")
    assert(out(12L) == ((12L, 3L)) && out(13L) == ((12L, 3L)),
      "equal timestamps are RANGE peers: both rows aggregate both values")
    assert(out(20L) == ((100L, 1L)))
  }

  test("anomalies: spike flags against its PRIOR baseline; minPrior gates; zero-variance edge") {
    val base = (1 to 5).map(i => (1L, i.toLong, ts(f"2024-01-01 00:0$i:00"), 10L))
    val e = (base ++ Seq(
      (1L, 6L, ts("2024-01-01 00:06:00"), 100L), // spike vs constant baseline
      (1L, 7L, ts("2024-01-01 00:07:00"), 10L)   // back to baseline value
    )).toDF("user", "eid", "t", "v")
    val out = Events.anomalies(e, "user", "t", "v", "1 hour",
        z2centi = 200L, minPrior = 5)
      .collect().map(r => r.getLong(1) -> ((r.getLong(4), r.getInt(5)))).toMap
    // first five rows have < 5 prior events -> never flagged
    for (i <- 1L to 5L) assert(out(i)._2 == 0, s"row $i must be below minPrior")
    // zero-variance baseline: any deviation is infinite z -> flagged
    assert(out(6L) == ((5L, 1)), "spike over a constant baseline must flag")
    // row 7's baseline INCLUDES the spike (but not itself): v=10 vs
    // mean 25, var 1125; z^2 = 225/1125 = 0.2 < 2 -> clean
    assert(out(7L) == ((6L, 0)), s"got ${out(7L)}")
    // equal value on a zero-variance baseline: 0 > 0 is false -> clean
    val flat = (1 to 6).map(i => (2L, 10L + i, ts(f"2024-01-01 00:0$i:00"), 7L))
      .toDF("user", "eid", "t", "v")
    val f = Events.anomalies(flat, "user", "t", "v", "1 hour", 200L, 5)
      .collect().map(r => r.getLong(1) -> r.getInt(5)).toMap
    assert(f(16L) == 0)
  }

  test("coOccurrence: co-presence not co-frequency, per-group once, support filter") {
    val e = Seq(
      ("g1", "a"), ("g1", "a"), ("g1", "b"), // duplicate 'a' counts once
      ("g2", "a"), ("g2", "b"), ("g2", "c"),
      ("g3", "b"), ("g3", "c")
    ).toDF("g", "i")
    val all = Events.coOccurrence(e, "g", "i")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(all == Map(("a", "b") -> 2L, ("a", "c") -> 1L, ("b", "c") -> 2L), s"got $all")
    // support threshold drops the 1-group pair
    val sup = Events.coOccurrence(e, "g", "i", minGroups = 2)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(sup == Set(("a", "b"), ("b", "c")))
    graft.CacheScope.release()
  }

  test("coOccurrence maxItemsPerGroup: planted mega-group fails loudly, bounded groups unchanged") {
    // a 500-item basket among normal 2-3 item groups
    val mega = (1 to 500).map(i => ("MEGA", s"item_$i"))
    val e = (Seq(("g1", "a"), ("g1", "b"), ("g2", "a"), ("g2", "b")) ++ mega)
      .toDF("g", "i")
    val ex = intercept[Exception] {
      Events.coOccurrence(e, "g", "i", minGroups = 1, maxItemsPerGroup = 100).collect()
    }
    graft.CacheScope.release()
    val msg = ex.getMessage + Option(ex.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("MEGA") && msg.contains("key_skew_profile"),
      s"the failure must name the group and point at the profile: $ex")
    // under the cap the guard is invisible: same result as unbounded
    val ok = Events.coOccurrence(e, "g", "i", minGroups = 2, maxItemsPerGroup = 500)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    graft.CacheScope.release()
    assert(ok == Set(("a", "b")))
    // and the unbounded default still absorbs the mega-group
    val n = Events.coOccurrence(e, "g", "i").count()
    graft.CacheScope.release()
    assert(n == 500L * 499 / 2 + 1, "mega-group pairs + the (a,b) pair")
  }

  test("gapFill maxSlotsPerKey: a span-runaway key fails loudly naming itself; bounded keys unchanged") {
    val e = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L),
      (1L, ts("2024-01-01 05:00:00"), 2L),   // 6 hourly slots
      (2L, ts("2024-01-01 00:00:00"), 3L),
      (2L, ts("2024-03-01 00:00:00"), 4L)    // ~1.4k hourly slots
    ).toDF("user", "t", "v")
    val ex = intercept[Exception] {
      Events.gapFill(e, "user", "t", "v", "1 hour", maxSlotsPerKey = 100).collect()
    }
    val msg = ex.getMessage + Option(ex.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("gapFill") && msg.contains("2"), s"must name the key: $ex")
    // under the cap the guard is invisible
    val ok = Events.gapFill(e.filter(col("user") === 1L), "user", "t", "v",
      "1 hour", maxSlotsPerKey = 100)
    assert(ok.count() == 6)
  }

  test("associationRules: exact integer confidence/lift, both directions, support filter") {
    // N=4 groups; n(a)=3, n(b)=3, n(c)=1; (a,b) co-present twice, (b,c) once
    val e = Seq(("g1", "a"), ("g1", "b"), ("g2", "a"), ("g2", "b"),
      ("g3", "a"), ("g4", "b"), ("g4", "c")).toDF("g", "i")
    val out = Events.associationRules(e, "g", "i")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    graft.CacheScope.release()
    assert(out(("a", "b")) == ((2L, 3L, 3L, 666666L, 888888L)),
      s"conf = floor(2e6/3), lift = floor(2*4e6/9): got ${out(("a", "b"))}")
    assert(out(("b", "a")) == ((2L, 3L, 3L, 666666L, 888888L)), "lift symmetric, conf per direction")
    assert(out(("b", "c")) == ((1L, 3L, 1L, 333333L, 1333333L)))
    assert(out(("c", "b")) == ((1L, 1L, 3L, 1000000L, 1333333L)),
      "confidence is asymmetric: c->b is certain")
    // support filter drops the 1-group pairs, keeps both (a,b) directions
    val sup = Events.associationRules(e, "g", "i", minGroups = 2)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    graft.CacheScope.release()
    assert(sup == Set(("a", "b"), ("b", "a")))
  }

  test("cusumChangepoints: Page's test via the prefix-min identity — reset after dips, NULL rows carry") {
    val e = Seq(
      (1L, 1L, ts("2024-01-01 00:00:00"), Some(20L)), // dev +10 -> S 10, flag
      (1L, 2L, ts("2024-01-01 01:00:00"), Some(0L)),  // dev -10 -> S resets to 0
      (1L, 3L, ts("2024-01-01 02:00:00"), Some(20L)), // dev +10 -> S 10 again
      (1L, 4L, ts("2024-01-01 03:00:00"), None: Option[Long]), // NULL: S carries, flag NULL
      (1L, 5L, ts("2024-01-01 04:00:00"), Some(11L)), // dev +1 -> S 11
      (2L, 6L, ts("2024-01-01 00:00:00"), Some(12L))  // other key isolated: S 2
    ).toDF("k", "eid", "t", "v")
    val out = Events.cusumChangepoints(e, "k", "t", "v",
        target = 10L, slack = 0L, threshold = 5L, tiebreak = Seq(col("eid")))
      .collect().map(r => r.getLong(1) -> ((r.getLong(4), Option(r.get(5))))).toMap
    assert(out(1L) == ((10L, Some(1))))
    assert(out(2L) == ((0L, Some(0))), "a dip must RESET the statistic (max-with-0), not go negative")
    assert(out(3L) == ((10L, Some(1))))
    assert(out(4L) == ((10L, None)), "NULL value: statistic carries, its own flag is NULL")
    assert(out(5L) == ((11L, Some(1))))
    assert(out(6L) == ((2L, Some(0))), "threshold is strict: needs S > threshold")
  }

  test("transitionMatrix: consecutive pairs per key in time order, keys never chain") {
    val e = Seq(
      (1L, 10L, ts("2024-01-01 00:00:00"), "a"),
      (1L, 11L, ts("2024-01-01 00:01:00"), "b"),
      (1L, 12L, ts("2024-01-01 00:02:00"), "a"),
      (2L, 20L, ts("2024-01-01 00:00:30"), "c") // lone event: no transition
    ).toDF("user", "eid", "t", "ty")
    val m = Events.transitionMatrix(e, "user", "t", "ty", Seq(col("eid")))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(m == Map(("a", "b") -> 1L, ("b", "a") -> 1L), s"got $m")
  }

  test("concurrencySweep: overlaps sum, exact-touch nets, zero-length invisible, partition-invariant") {
    val iv = Seq(
      (ts("2024-01-01 00:00:00"), ts("2024-01-01 02:00:00")), // A [0,2)
      (ts("2024-01-01 01:00:00"), ts("2024-01-01 03:00:00")), // B [1,3) overlaps A
      (ts("2024-01-01 03:00:00"), ts("2024-01-01 04:00:00")), // C [3,4) touches B: nets
      (ts("2024-01-01 05:00:00"), ts("2024-01-01 05:00:00"))  // zero-length: invisible
    ).toDF("s", "e")
    def run(df: org.apache.spark.sql.DataFrame) = {
      val r = Events.concurrencySweep(df, "s", "e")
        .collect().map(x => x.getTimestamp(0).toString -> x.getLong(1)).toMap
      graft.CacheScope.release(); r
    }
    val out = run(iv)
    assert(out == Map(
      "2024-01-01 00:00:00.0" -> 1L, "2024-01-01 01:00:00.0" -> 2L,
      "2024-01-01 02:00:00.0" -> 1L,
      "2024-01-01 03:00:00.0" -> 1L, // B ends and C starts at the same instant
      "2024-01-01 04:00:00.0" -> 0L,
      "2024-01-01 05:00:00.0" -> 0L), s"got $out")
    assert(run(iv.repartition(5)) == out, "prefix-sum must be partition-invariant")
  }

  test("periodOverPeriod: adjacent-period join, gaps yield NULL prev, exact ppm floor") {
    val e = Seq(
      (1L, ts("2024-01-01 00:00:00"), 100L), // period p
      (1L, ts("2024-01-09 00:00:00"), 150L), // p+1: +50% = 500000 ppm
      (1L, ts("2024-01-25 00:00:00"), 60L)   // p+3: GAP -> prev NULL
    ).toDF("k", "t", "v")
    val out = Events.periodOverPeriod(e, "k", "t", "v", periodDays = 7)
      .collect().map(r => r.getLong(1) ->
        ((r.getLong(2), Option(r.get(3)), r.getLong(4), Option(r.get(5))))).toMap
    val p = out.keys.min
    assert(out(p) == ((100L, None, 100L, None)))
    assert(out(p + 1) == ((150L, Some(100L), 50L, Some(500000L))))
    assert(out(out.keys.max) == ((60L, None, 60L, None)),
      "a gap period must NOT compare against an older period")
    assert(out.keys.max > p + 2, "the third row must actually sit past a gap")
    // negative growth floors exactly: 60 from 150 would be -600000; here
    // check via a dedicated adjacent pair
    val neg = Events.periodOverPeriod(Seq(
        (2L, ts("2024-01-01 00:00:00"), 3L), (2L, ts("2024-01-08 00:00:00"), 2L))
        .toDF("k", "t", "v"), "k", "t", "v", 7)
      .collect().flatMap(r => Option(r.get(5)).map(_.asInstanceOf[Long]))
    assert(neg.toSeq == Seq(-333334L), "floor division: -1/3 -> -333334, not -333333")
    graft.CacheScope.release()
  }

  test("gapFill: observed slots exact; LOCF/NOCB carries; integer lerp; head/tail fills") {
    val h = 3600000000L // 1 hour in micros
    val e = Seq(
      (1L, ts("2024-01-01 00:10:00"), 10L),
      (1L, ts("2024-01-01 00:50:00"), 5L),  // same slot as above -> sums to 15
      (1L, ts("2024-01-01 03:30:00"), 45L)  // 2-slot gap at 01:00 and 02:00
    ).toDF("user", "t", "v")
    val out = Events.gapFill(e, "user", "t", "v", "1 hour")
    val rows = out.orderBy("slot_ts").collect().map(r =>
      (r.getTimestamp(1).toString, r.getInt(2), Option(r.get(3)), Option(r.get(4)),
        r.getLong(5)))
    assert(rows.length == 4, "spine must span first..last observed slot inclusive")
    // slot 0: observed 15
    assert(rows(0) == ("2024-01-01 00:00:00.0", 1, Some(15L), Some(15L), 15000000L))
    // slots 1-2: lerp between 15 (i=..0) and 45 (i=..3): 25, 35
    assert(rows(1) == ("2024-01-01 01:00:00.0", 0, Some(15L), Some(45L), 25000000L))
    assert(rows(2) == ("2024-01-01 02:00:00.0", 0, Some(15L), Some(45L), 35000000L))
    assert(rows(3) == ("2024-01-01 03:00:00.0", 1, Some(45L), Some(45L), 45000000L))
    // head/tail: a key whose first/last slots are the only observations
    val e2 = Seq((2L, ts("2024-01-01 00:00:00"), 7L)).toDF("user", "t", "v")
    val one = Events.gapFill(e2, "user", "t", "v", "1 hour").collect()
    assert(one.length == 1 && one.head.getLong(5) == 7000000L)
  }

  test("funnelSteps emitAllKeys: never-started keys appear with furthest_step 0") {
    val e = Seq(
      (1L, "a", ts("2024-01-01 00:00:00")),
      (1L, "b", ts("2024-01-01 01:00:00")),
      (2L, "b", ts("2024-01-01 00:00:00")) // never does step 'a'
    ).toDF("user", "ty", "t")
    val out = Events.funnelSteps(e, "user", "t", "ty", Seq("a", "b"),
        emitAllKeys = true)
      .collect().map(r => r.getLong(0) -> ((Option(r.get(1)), r.getInt(3)))).toMap
    assert(out.keySet == Set(1L, 2L), "the whole key universe must appear")
    assert(out(1L)._2 == 2 && out(1L)._1.nonEmpty)
    assert(out(2L) == ((None, 0)), "a never-started key carries nulls + 0")
    // default shape unchanged: key 2 absent
    assert(Events.funnelSteps(e, "user", "t", "ty", Seq("a", "b"))
      .collect().map(_.getLong(0)).toSet == Set(1L))
  }

  test("rollingAgg: NULL values join neither roll_sum nor roll_cnt (sum/cnt stay in sync)") {
    val e = Seq(
      (1L, 10L, ts("2024-01-01 00:00:00"), Some(5L)),
      (1L, 11L, ts("2024-01-01 01:00:00"), None: Option[Long]), // NULL: invisible to both
      (1L, 12L, ts("2024-01-01 02:00:00"), Some(7L))
    ).toDF("user", "eid", "t", "v")
    val out = Events.rollingAgg(e, "user", "t", "v", "1 day")
      .collect().map(r => r.getLong(1) -> ((r.getLong(4), r.getLong(5)))).toMap
    assert(out(10L) == ((5L, 1L)))
    assert(out(11L) == ((5L, 1L)), "a NULL value must not bump roll_cnt")
    assert(out(12L) == ((12L, 2L)), "sum/cnt must agree so sum/cnt is the true mean")
  }

  test("concurrencySweep: NULL start/end fails loudly instead of skewing the prefix sum") {
    val iv = Seq(
      (Some(ts("2024-01-01 00:00:00")), Some(ts("2024-01-01 01:00:00"))),
      (Some(ts("2024-01-01 02:00:00")), None: Option[java.sql.Timestamp])
    ).toDF("s", "e")
    val ex = intercept[Exception] {
      Events.concurrencySweep(iv, "s", "e").collect()
    }
    assert(ex.getMessage.contains("concurrencySweep") ||
      Option(ex.getCause).exists(_.getMessage.contains("concurrencySweep")),
      s"got $ex")
    graft.CacheScope.release()
  }

  test("concurrencySweep: openEndAt clamps NULL ends to the horizon; NULL start still fails") {
    val iv = Seq(
      (Some(ts("2024-01-01 00:00:00")), Some(ts("2024-01-01 01:00:00"))),
      (Some(ts("2024-01-01 02:00:00")), None: Option[java.sql.Timestamp]) // still open
    ).toDF("s", "e")
    val horizon = lit("2024-01-01 03:00:00").cast("timestamp")
    val out = Events.concurrencySweep(iv, "s", "e", openEndAt = Some(horizon))
      .collect().map(x => x.getTimestamp(0).toString -> x.getLong(1)).toMap
    graft.CacheScope.release()
    assert(out == Map(
      "2024-01-01 00:00:00.0" -> 1L, "2024-01-01 01:00:00.0" -> 0L,
      "2024-01-01 02:00:00.0" -> 1L, // the open interval is active through the horizon
      "2024-01-01 03:00:00.0" -> 0L), s"got $out")
    val nullStart = Seq(
      (None: Option[java.sql.Timestamp], Some(ts("2024-01-01 01:00:00"))))
      .toDF("s", "e")
    val ex = intercept[Exception] {
      Events.concurrencySweep(nullStart, "s", "e", openEndAt = Some(horizon)).collect()
    }
    assert(ex.getMessage.contains("concurrencySweep") ||
      Option(ex.getCause).exists(_.getMessage.contains("concurrencySweep")),
      s"got $ex")
    graft.CacheScope.release()
  }

  test("periodOverPeriod: ppm numerator rides decimal(38,0) — i64-wrapping delta stays exact") {
    // delta = 1e13: delta * 1e6 = 1e19 wraps i64; decimal keeps it exact
    val big = Events.periodOverPeriodFromTotals(
      Seq((1L, 100L, 2L), (1L, 101L, 10000000000002L))
        .toDF("_k", "period", "total"), "k")
      .filter(col("period") === 101L).collect()
    assert(big.head.getLong(5) == 5000000000000000000L, s"got ${big.head}")
    // a quotient past i64 fails loudly, never a wrapped/NULL ppm
    val ex = intercept[Exception] {
      Events.periodOverPeriodFromTotals(
        Seq((1L, 100L, 1L), (1L, 101L, 10000000000001L))
          .toDF("_k", "period", "total"), "k").collect()
    }
    assert(ex.getMessage.contains("growth_ppm") ||
      Option(ex.getCause).exists(_.getMessage.contains("growth_ppm")), s"got $ex")
  }

  test("gapFill: lerp numerator rides decimal(38,0); overflow raises; all-NULL key stays NULL") {
    // 0 -> 5e12 across a 3-slot gap: numerator at i=2 is 1e19 (wraps
    // i64) — the decimal path floors it exactly
    val e = Seq(
      (1L, ts("2024-01-01 00:00:00"), 0L),
      (1L, ts("2024-01-01 03:00:00"), 5000000000000L)
    ).toDF("user", "t", "v")
    val rows = Events.gapFill(e, "user", "t", "v", "1 hour")
      .orderBy("slot_ts").collect().map(_.getLong(5))
    assert(rows.sameElements(Array(0L, 1666666666666666666L,
      3333333333333333333L, 5000000000000000000L)), s"got ${rows.toSeq}")
    // an interp past i64 fails loudly (observed 1e13 × 1e6 = 1e19 > i64)
    val ex = intercept[Exception] {
      Events.gapFill(Seq((1L, ts("2024-01-01 00:00:00"), 10000000000000L))
        .toDF("user", "t", "v"), "user", "t", "v", "1 hour").collect()
    }
    assert(ex.getMessage.contains("interp_micro") ||
      Option(ex.getCause).exists(_.getMessage.contains("interp_micro")), s"got $ex")
    // a key whose every value is NULL carries nothing: NULL, never a crash
    val nul = Events.gapFill(
      Seq((2L, ts("2024-01-01 00:00:00"), None: Option[Long]),
        (2L, ts("2024-01-01 01:00:00"), None: Option[Long]))
        .toDF("user", "t", "v"), "user", "t", "v", "1 hour").collect()
    assert(nul.forall(_.isNullAt(5)), "no observed value on either side -> NULL interp")
  }
}
