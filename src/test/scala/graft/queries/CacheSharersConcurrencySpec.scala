package graft.queries

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.{DataFrame, SparkSession}

import java.util.concurrent.TimeUnit
import scala.collection.concurrent.TrieMap

/** Forced-race discipline for EVERY CacheScope consumer (r11 verdict
  * item 4): each cache-sharing operator family runs concurrently with
  * ITSELF and with a fragment-sharing sibling — the q41/q45/q46-style
  * overlap where two gates' internal persists collide on Spark's
  * canonicalized-plan cache dedup and one gate's release can touch an
  * entry the sibling still holds. Eight workers per group, five repeats,
  * every result hash-compared to the serial reference.
  *
  * Groups cover the seven early-unpersist sites and every `retain` in an
  * iterative loop:
  *  - shingle store: minhash (q41) / exact-jaccard pairs (q42) / CC
  *    clusters (q45) — three consumers of ONE shingled() plan;
  *  - CC loop (retain e0/edges + per-round propagated): q45 with itself
  *    and with the embedding-modality CC (q55);
  *  - unit-vector store + IVF base: banded candidates (q56), exact pairs
  *    (q44), IVF pair arm (q223), IVF kNN build (q221);
  *  - iterative graph loops (co-partitioned edges retained across
  *    rounds): PageRank (q132) / label-prop (q133) over the SAME IVF
  *    edge build, plus the q135 composition that shares both;
  *  - BT duel chain (retain c/dir/items + per-round checkpoints): q184
  *    with itself and the q191 Spearman composition over the same chain;
  *  - BPE merge loop + token stores: q94 with the q92 LM scorer
  *    (both persist token-grain frames over documents).
  */
class CacheSharersConcurrencySpec extends SparkSpec {

  private val groups: Seq[(String, Seq[String])] = Seq(
    "shingle-store" -> Seq("q41_dedup_minhash", "q42_ngram_jaccard", "q45_dedup_clusters"),
    "cc-loop" -> Seq("q45_dedup_clusters", "q45_dedup_clusters", "q55_embed_clusters"),
    "unit-vector-store" -> Seq("q56_embed_neardup_cand", "q44_embed_neardup", "q223_ivf_neardup"),
    "ivf-graph-loops" -> Seq("q221_ivf_knn_graph", "q132_pagerank", "q133_label_prop", "q135_curation_v6"),
    "bt-chain" -> Seq("q184_bradley_terry", "q184_bradley_terry", "q191_leaderboard_agreement"),
    "bpe-token-stores" -> Seq("q94_bpe", "q92_lm_score"))

  private val workers = 8
  private val repeats = 5

  private def fingerprint(df: DataFrame): String = {
    val cols = df.columns.sorted
    df.select(cols.head, cols.tail: _*).collect().map(_.toString).sorted.mkString("\n")
  }

  private def run(s: SparkSession, name: String): String =
    try fingerprint(SparkEntry.queries(name)(s, sf))
    finally graft.CacheScope.release()

  for ((group, gates) <- groups)
    test(s"cache-sharing group '$group' survives 8-way self+sibling concurrency, 5 repeats") {
      val names = gates.distinct
      val reference: Map[String, String] = names.map(n => n -> run(spark, n)).toMap
      for (rep <- 1 to repeats) {
        val failures = TrieMap[Int, Throwable]()
        val results = TrieMap[Int, (String, String)]()
        val threads = (0 until workers).map { w =>
          val gate = gates(w % gates.size)
          val t = new Thread(() => {
            try results(w) = gate -> run(spark.newSession(), gate)
            catch { case e: Throwable => failures(w) = e }
          }, s"sharer-$group-$rep-$w")
          t.start(); t
        }
        threads.foreach(_.join(TimeUnit.MINUTES.toMillis(15)))
        assert(threads.forall(!_.isAlive), s"[$group rep $rep] a worker wedged")
        failures.headOption.foreach { case (w, e) =>
          fail(s"[$group rep $rep] worker $w threw ${e.getClass.getSimpleName}: ${e.getMessage}", e)
        }
        results.foreach { case (w, (gate, fp)) =>
          assert(fp == reference(gate),
            s"[$group rep $rep] worker $w diverged from the serial reference on $gate")
        }
      }
    }
}
