package graft

/** The driver contract itself: entry() returns rows on sf0.001 (the
  * driver's smoke check), every gate query has a runnable builder, and
  * every oracle key references a real query. */
class SparkEntrySpec extends SparkSpec {

  test("entry() flagship returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a matching query builder") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle SQL without a query: $orphans")
  }

  test("gate inventory: no cross-pack name collisions") {
    // `queries` is built by ++ over the per-family packs; a duplicate key
    // would silently shadow an earlier gate. Assert the combined size
    // equals the sum of the pack sizes so a collision can never ship.
    val packs = Seq(
      graft.queries.RelationalQueries.all, graft.queries.TextQueries.all,
      graft.queries.DedupQueries.all, graft.queries.AnnQueries.all,
      graft.queries.MultimodalQueries.all, graft.queries.StreamingQueries.all,
      graft.queries.GraphQueries.all, graft.queries.WebQueries.all,
      graft.queries.RankQueries.all, graft.queries.MetricsQueries.all,
      graft.queries.PrivacyQueries.all)
    assert(packs.map(_.size).sum == SparkEntry.queries.size,
      "duplicate gate name across query packs (a later pack is shadowing an earlier one)")
  }

  test("gate inventory: the rows-only set is exactly the approximate-by-contract family") {
    // Single source of truth for "which gates may lack a DuckDB oracle":
    // the approximate family, each of which is paired with a hash-gated
    // exact audit twin (qNNa_*). Any NEW gate must ship with an oracle or
    // be deliberately added here — the count itself is derived, never pinned.
    val approximateByContract = Set(
      "q51_ann_lsh", "q52_approx_distinct", "q53_ann_ivf", "q54_sketches",
      "q66_ann_pq", "q67_ann_ivfpq", "q91_ann_pca", "q94_bpe",
      "q95_diversity_sample")
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(rowsOnly == approximateByContract,
      s"rows-only drift: unexpected=${rowsOnly -- approximateByContract} " +
        s"missing=${approximateByContract -- rowsOnly}")
  }

  test("round-12 production arms: bounded-state BT and IVF pair gates oracle-backed") {
    val fam = Set("q222_stream_bt_bounded", "q223_ivf_neardup")
    assert(fam.subsetOf(SparkEntry.queries.keySet))
    assert(fam.subsetOf(SparkEntry.oracleSql.keySet),
      "the round-12 production arms must never be rows-only")
  }

  test("round-9 metrics family: all five gates oracle-backed") {
    val fam = Set("q192_roc_auc", "q193_retrieval_metrics", "q194_ks_drift",
      "q195_cohen_kappa", "q197_search_eval")
    assert(fam.subsetOf(SparkEntry.queries.keySet))
    assert(fam.subsetOf(SparkEntry.oracleSql.keySet),
      "the metrics family must never be rows-only")
  }

  test("round-9 web-curation family: all ten gates oracle-backed") {
    val r9 = Set("q172_gopher_rules", "q173_c4_clean", "q174_perplexity_buckets",
      "q175_chat_render", "q176_stream_gopher", "q177_curation_v7",
      "q178_preference_pairs", "q179_loss_mask",
      "q180_stream_preference_pairs", "q181_bleu")
    assert(r9.subsetOf(SparkEntry.queries.keySet))
    assert(r9.subsetOf(SparkEntry.oracleSql.keySet),
      "the web-curation family must never be rows-only")
  }

  test("round-9 eval/ranking family: all ten gates oracle-backed") {
    val fam = Set("q182_chrf", "q183_token_f1", "q184_bradley_terry",
      "q185_unimax", "q186_stream_retention_f1", "q187_preference_leaderboard",
      "q188_stream_bradley_terry", "q189_unimax_draw", "q190_pass_at_k",
      "q191_leaderboard_agreement")
    assert(fam.subsetOf(SparkEntry.queries.keySet))
    assert(fam.subsetOf(SparkEntry.oracleSql.keySet),
      "the eval/ranking family must never be rows-only")
  }

  test("audit family: every round-8 audit gate carries a full oracle") {
    val audits = SparkEntry.queries.keySet.filter(_.matches("q\\d+a_.*"))
    assert(audits.size == 9, s"expected 9 audit gates, got $audits")
    val missing = audits -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty, s"audit gates must never be rows-only: $missing")
  }
}
