package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Pairwise-comparison ranking — the leaderboard layer of an RLHF /
  * eval pipeline: turn a table of (winner, loser) outcomes (human
  * preference votes, A/B eval verdicts, chatbot-arena battles) into a
  * per-item strength score.
  *
  * [[bradleyTerry]] follows the engine's iterative contract (the
  * [[Graph]] pattern): a FIXED number of synchronous MM rounds, integer
  * micro-unit arithmetic throughout (every division is an integral
  * floor on non-negative operands, wide products ride decimal(38,0)),
  * `localCheckpoint` per round to truncate lineage, retired rounds'
  * blocks freed in-loop — so the result is bit-identical across
  * engines, partitionings, and runs, and the oracle can replay it as an
  * unrolled CTE chain.
  */
object Rank {

  /** Bradley-Terry strength ratings from pairwise outcomes via fixed
    * synchronous rounds of Hunter's MM algorithm (Hunter 2004, "MM
    * algorithms for generalized Bradley-Terry models").
    *
    * Model: P(i beats j) = γ_i / (γ_i + γ_j). MM update per round:
    * `γ'_i = W_i / Σ_{j: n_ij > 0} n_ij / (γ_i + γ_j)` where `W_i` is
    * i's total wins and `n_ij` the number of i-vs-j comparisons; each
    * round then renormalizes to mean 1,000,000 micro-units (the gauge
    * fix — BT strengths are scale-free). Integer replay:
    * `t = (n_ij · 10^12) div (γ_i + γ_j)` per opposing pair,
    * `γ' = (W_i · 10^12) div Σt`, then
    * `γ'' = (γ' · N · 10^6) div Σγ'` with the wide product on
    * decimal(38,0). All operands are non-negative, so integral `div`
    * equals floor in both engines. Never-winning items rate 0 after
    * round 1 (the MM fixed point for W = 0); items appear only via
    * comparisons, so every denominator is positive by construction.
    *
    * Scale shape: comparisons aggregate ONCE to the canonical
    * (i, j, n) pair grain — corpus volume rides that map-side-combined
    * aggregation and is never touched again. The per-round state is one
    * row per ITEM (γ), joined twice into the direction-expanded pair
    * frame; items ≪ pairs, so both joins broadcast (AQE falls back to
    * shuffle joins past the threshold), and the pair frame — partitioned
    * and sorted by item once, then cached — never re-shuffles: the
    * per-round denominator aggregation reuses its partitioning. Total
    * work is `rounds × O(|pairs|)` with no driver-side data; the one
    * scalar (the normalization total) rides a broadcast 1-row frame
    * inside the plan.
    *
    * Output: `(item_id, rating_micro, wins, comparisons)` — wins/
    * comparisons are the exact integer tallies the rating explains.
    *
    * `weightCol` (optional): each input row counts as that many
    * identical duels instead of 1 — the PRE-AGGREGATED duel-log form
    * (e.g. a streaming pair-count state drained in complete mode feeds
    * ratings without re-exploding to row grain); exactly equivalent to
    * the exploded log (spec-tested law). */
  def bradleyTerry(comps: DataFrame, winnerCol: String, loserCol: String,
      rounds: Int, weightCol: String = null): DataFrame = {
    require(rounds >= 1, "rounds >= 1")
    val idType = comps.schema(winnerCol).dataType
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val w = Option(weightCol).map(col(_).cast("long")).getOrElse(lit(1L))
    val c = graft.CacheScope.track(
      comps.select(col(winnerCol).cast("long").as("_w"), col(loserCol).cast("long").as("_l"),
          w.as("_k"))
        .cache())
    // canonical undirected pair counts, then both directions — the
    // |pairs|-row loop frame, partitioned AND sorted on the per-round
    // aggregation key so no round re-shuffles it
    val pairs = c.select(least(col("_w"), col("_l")).as("_i"),
        greatest(col("_w"), col("_l")).as("_j"), col("_k"))
      .groupBy("_i", "_j").agg(sum(col("_k")).as("_n"))
      .filter(col("_n") > 0)
    val p = Graph.iterPartitions(c, c.count())
    val dir = graft.CacheScope.track(
      pairs.select(col("_i").as("_item"), col("_j").as("_opp"), col("_n"))
        .union(pairs.select(col("_j").as("_item"), col("_i").as("_opp"), col("_n")))
        .repartition(p, col("_item")).sortWithinPartitions("_item").cache())
    val items = graft.CacheScope.track(
      dir.groupBy("_item").agg(sum(col("_n")).as("_comps"))
        .join(c.groupBy("_w").agg(sum(col("_k")).as("_wins"))
            .withColumnRenamed("_w", "_item"),
          Seq("_item"), "left")
        .select(col("_item"), coalesce(col("_wins"), lit(0L)).as("_wins"),
          col("_comps"))
        .repartition(p, col("_item")).sortWithinPartitions("_item").cache())
    dir.count(); items.count()
    c.unpersist(false)
    // floor division on decimal(38,0) operands (non-negative here) — the
    // engine-wide idiom; a long multiply would overflow past wins ~ 9e6
    def fdiv(a: Column, b: Column): Column = (a - pmod(a, b)).divide(b)
    val scale = dec(lit(1000000000000L)) // 10^12
    var g = items.select(col("_item"), lit(1000000L).as("_g")).localCheckpoint()
    for (_ <- 1 to rounds) {
      val denom = dir
        .join(g.select(col("_item"), col("_g").as("_gi")), Seq("_item"))
        .join(g.select(col("_item").as("_opp"), col("_g").as("_gj")), Seq("_opp"))
        .select(col("_item"),
          fdiv(dec(col("_n")) * scale, dec(col("_gi") + col("_gj")))
            .cast("decimal(38,0)").as("_t"))
        // decimal sums: a long sum would wrap silently past 2^63 at
        // cluster comparison volumes (Spark doesn't overflow-check sum)
        .groupBy("_item").agg(sum(col("_t")).as("_D"))
      val gp = items
        .join(denom, Seq("_item"))
        .select(col("_item"),
          // D = 0 can only happen when every per-pair term truncated to
          // zero (γ_i + γ_j > n·10^12 — needs ~5·10^5+ items sharing one
          // rating pool); rate 0 deterministically rather than null-poison
          when(col("_D") > 0,
            fdiv(dec(col("_wins")) * scale, dec(col("_D"))).cast("long"))
            .otherwise(0L).as("_gp"))
      val tot = gp.agg(
        sum(dec(col("_gp"))).as("_T"), count(lit(1)).as("_N"))
      val next = gp.crossJoin(broadcast(tot))
        .select(col("_item"),
          when(col("_T") > 0,
            fdiv(dec(col("_gp")) * dec(col("_N")) * dec(lit(1000000L)),
              dec(col("_T"))).cast("long"))
            .otherwise(0L).as("_g"))
        .localCheckpoint()
      graft.CacheScope.releaseLocalCheckpoint(g)
      g = next
    }
    graft.CacheScope.trackCheckpoint(g)
    items.join(g, Seq("_item"))
      .select(col("_item").cast(idType).as("item_id"),
        col("_g").as("rating_micro"), col("_wins").as("wins"),
        col("_comps").as("comparisons"))
  }
}
