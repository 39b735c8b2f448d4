package graft.operators

import graft.CacheScope
import graft.functions.{Portable, TextFunctions}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.storage.StorageLevel

/** Document-shaping operators for training-data preparation: token-window
  * chunking (context-length packing input) and PII redaction (curation
  * compliance stage). Both are pure Catalyst projections — per-row,
  * no shuffle, fully codegen — and both are exactly replayable in SQL,
  * so the gate hash-checks them end to end (q59, q64).
  */
object TextOps {

  /** Split each document into overlapping token windows of `window`
    * tokens, stepping `window - overlap` tokens — the standard chunking
    * step before tokenizer packing (overlap preserves cross-boundary
    * context). Chunk starts are `k·step`; the final chunk may be shorter
    * (never empty); a document with ≤ `window` tokens yields one chunk.
    * Output: one row per (doc, chunk) with the chunk index, token count
    * and re-joined text. */
  def chunkTokens(docs: DataFrame, idCol: String, textCol: String,
      window: Int, overlap: Int): DataFrame = {
    require(window >= 1, "window >= 1")
    require(overlap >= 0 && overlap < window, "0 <= overlap < window")
    val step = window - overlap
    val toks = TextFunctions.tokens(col(textCol))
    val nTok = size(toks)
    // 1 + ceil(max(0, nTok - window) / step) chunks
    val nChunks = (lit(1) + ceil(greatest(nTok - window, lit(0)).cast("double") / step)).cast("int")
    docs
      .select(col(idCol), toks.as("_toks"), nChunks.as("_nc"))
      .select(col(idCol),
        posexplode(transform(sequence(lit(0), col("_nc") - 1),
          k => slice(col("_toks"), k * step + 1, lit(window)))).as(Seq("chunk_idx", "_chunk")))
      .select(col(idCol), col("chunk_idx"),
        size(col("_chunk")).as("n_tokens"),
        concat_ws(" ", col("_chunk")).as("chunk_text"))
  }

  /** Sequential pack assignment: walking rows in `idCol` order, each row's
    * pack is `floor(cumulative-weight-before-it / budget)` — the
    * deterministic contiguous-greedy packing used to group documents into
    * fixed token budgets for training batches (order-stable: same data →
    * same packs, no rand(), replayable as a SQL window cumsum).
    *
    * The cumulative sum is a DISTRIBUTED two-phase prefix sum, NOT a
    * global-order window (which Spark executes as a single partition — the
    * classic scale killer for exactly this query): range-partition by id,
    * cumsum per partition in parallel windows, then shift each partition
    * by the total of all partitions before it. The per-partition totals
    * are a #partitions-row collect (a model fetch, like the IVF
    * centroids); everything row-scale stays distributed.
    *
    * The cumulative sum rides the shared
    * [[graft.operators.Relational.distributedPrefixSum]] (which owns the
    * pinned-partitioning / checkpoint lifecycle — see its doc for why
    * the range-partitioned frame must be persisted across its two
    * consumer jobs). */
  def sequentialPack(df: DataFrame, idCol: String, weightCol: String,
      budget: Long): DataFrame = {
    require(budget >= 1, "budget >= 1")
    val cum = graft.operators.Relational.distributedPrefixSum(
      df.select(col(idCol), col(weightCol).cast("long").as("_w")),
      Seq(col(idCol)), "_w")
    // exact integer floor-division for ANY budget: subtract the remainder
    // first, so the double division is of an exact multiple (Spark's `/`
    // on longs is double division)
    val cumBefore = col("_cum_incl") - col("_w")
    cum.withColumn("pack_id",
        ((cumBefore - pmod(cumBefore, lit(budget))) / lit(budget)).cast("long"))
      .select(col(idCol), col("_w").as("weight"), col("pack_id"))
  }

  // Conservative syntax shared by Java regex and RE2 (no lookaround, no
  // backrefs) so the SQL oracle replays the exact same matches.
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\+?[0-9]{3}-[0-9]{3,4}-[0-9]{4}"

  /** All stride-1 token `n`-grams of a token array, re-joined with single
    * spaces; empty (never null) below `n` tokens. `toks` MUST be a plain
    * attribute, not a computed expression: the slice inside the transform
    * lambda re-evaluates its input per array ELEMENT, so passing the
    * tokenizer expression here costs one regex split per n-gram instead of
    * per row (measured 6× on the q73 gate — see [[explodedNgrams]], which
    * projects the tokens first and is what operators should use). */
  private def ngramArr(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(sequence(lit(0), size(toks) - n),
        k => array_join(slice(toks, k + 1, lit(n)), " ")))
      .otherwise(array().cast("array<string>"))

  /** One row per (id, n-gram): tokenize ONCE into a projected attribute,
    * then explode the n-gram transform over it. */
  private def explodedNgrams(docs: DataFrame, idCol: String, textCol: String,
      n: Int, alias: String): DataFrame =
    docs.select(col(idCol), TextFunctions.tokens(col(textCol)).as("_toks"))
      .select(col(idCol), explode(ngramArr(col("_toks"), n)).as(alias))

  /** Canonical text normalization before shingling/dedup — lowercase,
    * non-alphanumerics to spaces, whitespace collapsed, trimmed — emitted
    * as `norm_text` alongside the original. Pure projection — per-row, no
    * shuffle, whole-stage codegen (the NFC step is a codegen'd Catalyst
    * expression, [[graft.catalyst.UnicodeNormalize]]).
    *
    * `unicode = false` (default): ASCII-level — `[^a-z0-9\s]` → space —
    * for corpora already known clean. `unicode = true`: the multilingual
    * mode — Unicode NFC composition first (JDK `java.text.Normalizer`,
    * UAX #15; decomposed `e`+COMBINING ACUTE and precomposed `é` become
    * the same bytes), then lowercase, then `[^\p{L}\p{N}\s]` → space so
    * letters/digits of every script survive. Both modes stay in the
    * Java∩RE2 regex surface and DuckDB ships `nfc_normalize()`, so BOTH
    * are replayed byte-identically by the oracle (gates q81, q83). */
  def normalizeText(docs: DataFrame, textCol: String,
      unicode: Boolean = false): DataFrame = {
    val (canon, strip) =
      if (unicode) (graft.catalyst.UnicodeNormalize.nfc(col(textCol)), "[^\\p{L}\\p{N}\\s]")
      else (col(textCol), "[^a-z0-9\\s]")
    docs.withColumn("norm_text",
      trim(regexp_replace(regexp_replace(lower(canon), strip, " "), "\\s+", " ")))
  }

  /** HTML-to-text extraction — the first stage of a web-crawl curation
    * pipeline (the WET-file shape): drop `<script>`/`<style>` blocks with
    * their content, drop comments, strip every remaining tag, decode the
    * six ubiquitous character entities, collapse whitespace. Emitted as
    * `plain_text` alongside the original.
    *
    * Semantics are regex-grade by design — the standard crawl-extraction
    * tradeoff: a full HTML5 tree builder buys little for model-training
    * text and costs a per-row parser that can't ride whole-stage codegen.
    * Order is load-bearing and fixed: script/style content dies with its
    * element FIRST (non-greedy case-insensitive block match — RE2 has no
    * backreferences, so the two elements are separate patterns), then
    * comments, then tags, and entity decode runs AFTER tag stripping (a
    * decoded '<' can never resurrect as markup) with `&amp;` decoded LAST
    * (so `&amp;lt;` yields the literal `&lt;`, not `<`). Pure projection —
    * per-row, no shuffle, one WholeStageCodegen span; every pattern stays
    * in the Java∩RE2 surface so the DuckDB oracle replays the gate
    * byte-identically (q121). Known regex-grade limit: an UNCLOSED
    * `<script>`/`<style>` element loses only its open tag, so its body
    * leaks into the text (a tree builder would drop it; crawl extractors
    * routinely accept this on malformed markup). */
  def htmlToText(docs: DataFrame, textCol: String): DataFrame = {
    val noScript = regexp_replace(col(textCol),
      "(?is)<script\\b[^>]*>.*?</script\\s*>", " ")
    val noStyle = regexp_replace(noScript,
      "(?is)<style\\b[^>]*>.*?</style\\s*>", " ")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
    val noTags = regexp_replace(noComment, "(?s)<[^>]*>", " ")
    val decoded = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
        "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (ent, ch)) => replace(c, lit(ent), lit(ch)) }
    docs.withColumn("plain_text", trim(regexp_replace(decoded, "\\s+", " ")))
  }

  /** Sentence segmentation: split `textCol` into terminator-delimited
    * sentences ('.', '!', '?'; a run of terminators sticks to its
    * sentence, a trailing un-terminated fragment is a sentence too) —
    * one row per non-empty sentence with its 0-based `sent_idx` and
    * character count. The grain between q88's paragraphs and q59's token
    * chunks: sentence-grain dedup, sentence-boundary-respecting chunking,
    * and per-sentence quality filters all start here.
    *
    * Shape: `regexp_extract_all` into an array attribute, trim + drop
    * empties INSIDE the array (so indices are contiguous over kept
    * sentences and empty segments never reach the generator), one
    * posexplode — per-row generate, no shuffle. The pattern
    * `[^.!?]+[.!?]*|[.!?]+` is deliberately lookbehind-free: RE2
    * (DuckDB) has no lookbehind, so the usual split-on-`(?<=[.!?])\s+`
    * idiom would strand the oracle (q122 replays this byte-identically).
    * The second branch makes segmentation LOSSLESS on every input: a
    * terminator run with no preceding content (an ellipsis opening a
    * text, or opening a reassembled fragment mid-pipeline) is its own
    * sentence rather than silently vanishing — without it, re-splitting
    * [[dedupSentences]]' reassembled output could drop a surviving
    * leading '…' and desynchronize the q127 composition from its oracle
    * (property-tested: concat of sentences == input modulo whitespace).
    *
    * `terminators` is the sentence-final character set — ASCII `.!?` by
    * default; multilingual corpora pass the CJK set too (e.g.
    * `".!?。！？…"` — RE2 and Java both match the literals inside a
    * class, so the oracle still replays; `CjkTerminators` is the ready
    * union). Characters special inside a class in EITHER engine are
    * escaped (incl. `[` and `&`, literal in RE2 but nested-class /
    * intersection syntax in Java). */
  val CjkTerminators = ".!?。！？…"

  /** The segmentation regex for a terminator set — ONE builder feeding
    * both [[splitSentences]] and every sentence-family oracle (the
    * bm25CtesSql sharing discipline: the two engines cannot drift). */
  private[graft] def sentencePattern(terminators: String): String = {
    require(terminators.nonEmpty, "at least one sentence terminator")
    val cls = terminators.flatMap {
      case c @ ('\\' | ']' | '^' | '-' | '[' | '&') => "\\" + c
      case c => c.toString
    }
    s"[^$cls]+[$cls]*|[$cls]+"
  }

  def splitSentences(docs: DataFrame, idCol: String, textCol: String,
      terminators: String = ".!?"): DataFrame = {
    val segs = regexp_extract_all(col(textCol),
      lit(sentencePattern(terminators)), lit(0))
    val sents = filter(transform(segs, s => trim(s)), s => s =!= "")
    docs.select(col(idCol), posexplode(sents).as(Seq("sent_idx", "sentence")))
      .withColumn("sent_chars", length(col("sentence")))
  }

  /** Sentence-boundary-respecting chunking: greedy contiguous chunks of
    * whole sentences, ~`budget` tokens each — the RAG/context-window
    * chunker that never cuts mid-sentence (vs [[chunkTokens]]' fixed
    * token windows). Chunk assignment is the [[sequentialPack]]
    * convention: chunk = floor(tokens-before / budget) over the doc's
    * sentences in order — deterministic and SQL-replayable; a sentence
    * longer than `budget` overflows its own chunk (ids are stable, not
    * necessarily dense) rather than being split. Output per (doc,
    * chunk): re-joined text, sentence and token counts.
    *
    * Shape: [[splitSentences]]' per-row generate, one per-doc running-sum
    * window (partition bounded by the doc's own sentence count — never a
    * corpus-wide sort), and one keyed agg whose sorted-struct reassembly
    * is bounded by each chunk's sentence count (the q88 idiom). */
  def sentenceChunks(docs: DataFrame, idCol: String, textCol: String,
      budget: Long): DataFrame = {
    require(budget >= 1, "budget >= 1")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("sent_idx"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val sents = splitSentences(docs, idCol, textCol)
      // single-space split (not the \s+ tokenizer): sentence text is
      // already trimmed, and the oracle's string_split must agree token
      // for token
      .withColumn("_nt", size(split(col("sentence"), " ")).cast("long"))
      .withColumn("_cb", coalesce(sum(col("_nt")).over(w), lit(0L)))
    sents
      .withColumn("chunk_id",
        ((col("_cb") - pmod(col("_cb"), lit(budget))) / lit(budget)).cast("long"))
      .groupBy(col(idCol), col("chunk_id"))
      .agg(
        array_join(transform(
          array_sort(collect_list(struct(col("sent_idx"), col("sentence")))),
          x => x.getField("sentence")), " ").as("chunk_text"),
        count(lit(1)).as("n_sents"),
        sum(col("_nt")).as("n_tokens"))
  }

  /** Gopher-style n-gram repetition statistics per document — the
    * repetition quality filter of a curation pipeline (drop docs whose
    * most frequent n-gram dominates, or whose n-gram stream is mostly
    * duplicates). Per doc: total / distinct n-gram counts, the top
    * n-gram's occurrence count, and the two derived fractions
    * (`dup_frac` = 1 − distinct/total, `top_frac` = top/total; both NULL
    * for docs shorter than `n` tokens).
    *
    * Distributed shape: explode n-grams → count per (doc, n-gram) →
    * re-aggregate per doc. Two keyed aggregations with map-side partial
    * combine, never a per-row mode loop (which would be O(len²) per doc);
    * fractions are single IEEE divisions of exact longs, so the DuckDB
    * oracle matches bit-exact. */
  def repetitionStats(docs: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame = {
    require(n >= 1, "n >= 1")
    val perNgram = explodedNgrams(docs, idCol, textCol, n, "_ng")
      .groupBy(col(idCol), col("_ng")).agg(count(lit(1)).as("_c"))
    val perDoc = perNgram.groupBy(idCol).agg(
      sum("_c").as("n_ngrams"),
      count(lit(1)).as("n_distinct"),
      max("_c").as("top_cnt"))
    docs.select(col(idCol)).join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_ngrams"), lit(0L)).as("n_ngrams"),
        coalesce(col("n_distinct"), lit(0L)).as("n_distinct"),
        coalesce(col("top_cnt"), lit(0L)).as("top_cnt"))
      .withColumn("dup_frac",
        when(col("n_ngrams") > 0,
          lit(1.0) - Portable.ratio(col("n_distinct"), col("n_ngrams"))))
      .withColumn("top_frac",
        when(col("n_ngrams") > 0, Portable.ratio(col("top_cnt"), col("n_ngrams"))))
  }

  /** BM25 keyword search: top-`k` documents for a bag-of-terms query
    * (Okapi BM25, k1/b defaults per Robertson et al.). Scores are exported
    * as `score_micro` = Σ round(10⁶·idf·tf-norm) per matched term — each
    * per-(doc,term) contribution is quantized to an exact long BEFORE the
    * per-doc sum, so the aggregate is order-free and the DuckDB oracle
    * replays it (the Portable convention; `ln` is the one transcendental,
    * same 1-ulp-before-rounding exposure as the haversine gate q19).
    *
    * Distributed shape: tokens are filtered to query terms BEFORE the
    * explode (map-side prune — non-query tokens never reach a shuffle),
    * per-term document frequencies are a query-sized broadcast, corpus
    * size/avgdl ride a broadcast 1-row frame (no driver collect), and the
    * final top-k is a partial-top-k sort-limit, never a global sort. The
    * pruned (id, doclen, query-tokens) projection feeds three consumers
    * (corpus stats, tf, df), so it is persisted for the plan's lifetime
    * ([[graft.CacheScope]]-tracked) — one corpus scan, not three.
    *
    * Matching is VERBATIM against whitespace tokens — no case folding or
    * punctuation stripping — so documents and query terms must share a
    * normalization (run both through [[normalizeText]] first, or
    * pre-clean the corpus); 'Spark' or 'spark,' in a document does not
    * match query term 'spark' by design.
    *
    * The query-term prune is an `isin` literal list, i.e. O(|query|) per
    * token — right for human-scale queries (an IN set of tens to
    * hundreds of terms stays codegen'd). A batch-scoring workload with
    * tens of thousands of "query" terms is [[bm25ScoreBatch]]: explode
    * tokens and broadcast-join the terms table instead. */
  def bm25Search(docs: DataFrame, idCol: String, textCol: String,
      query: Seq[String], k: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(query.nonEmpty, "query terms required")
    require(k >= 1, "k >= 1")
    if (query.size > IsinQueryTermCap)
      // past the literal-list regime, dispatch to the batch arm: an IN
      // list of thousands of terms stops being codegen-friendly while a
      // broadcast hash join does not care
      return bm25ScoreBatch(docs, idCol, textCol,
        docs.sparkSession.createDataFrame(query.map(Tuple1(_))).toDF("_term"),
        "_term", k, k1, b)
    val toks = TextFunctions.tokens(col(textCol))
    val base = CacheScope.track(
      docs.select(col(idCol), size(toks).cast("long").as("_dl"),
        filter(toks, t => t.isin(query.map(x => x: Any): _*)).as("_qt"))
        .persist(StorageLevel.MEMORY_ONLY))
    val stats = base.agg(count(lit(1)).as("_n"), sum("_dl").as("_sumdl"))
    val tf = base.select(col(idCol), col("_dl"), explode(col("_qt")).as("term"))
      .groupBy(col(idCol), col("_dl"), col("term")).agg(count(lit(1)).as("tf"))
    bm25ScoreTail(tf, stats, idCol, k, k1, b)
  }

  /** Shared scoring tail of both BM25 arms: per-term df broadcast, 1-row
    * stats frame, quantized per-(doc,term) contributions, partial top-k.
    * ONE implementation so the two-arms-identical contract (TextOpsSpec,
    * the shared q72/q85 oracle) can never drift. `tf` must carry
    * `(idCol, _dl, term, tf)`. */
  private def bm25ScoreTail(tf: DataFrame, stats: DataFrame, idCol: String,
      k: Int, k1: Double, b: Double): DataFrame = {
    val dfT = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val avgdl = col("_sumdl").cast("double") / col("_n").cast("double")
    val idf = log(
      ((col("_n") - col("df")).cast("double") + lit(0.5)) /
        (col("df").cast("double") + lit(0.5)) + lit(1.0))
    val tfNorm = (col("tf").cast("double") * (lit(k1) + lit(1.0))) /
      (col("tf").cast("double") +
        lit(k1) * (lit(1.0) - lit(b) + lit(b) * (col("_dl").cast("double") / avgdl)))
    tf.join(broadcast(dfT), "term")
      .crossJoin(broadcast(stats))
      .withColumn("_c", round(lit(1e6) * (idf * tfNorm)).cast("long"))
      .groupBy(idCol)
      .agg(sum(col("_c")).as("score_micro"), count(lit(1)).as("n_terms"))
      .orderBy(col("score_micro").desc, col(idCol))
      .limit(k)
  }

  /** Above this many query terms, [[bm25Search]] switches from the `isin`
    * literal prune to the broadcast-terms-table arm ([[bm25ScoreBatch]]):
    * an IN list this long is no longer a cheap codegen'd membership test,
    * while the term count is still far below broadcast limits. */
  val IsinQueryTermCap = 256

  /** BM25 batch-scoring arm: identical Okapi BM25 scores to
    * [[bm25Search]] (same quantized `score_micro` export, same top-`k`
    * contract, same verbatim-token matching caveat), but the query is a
    * TABLE of terms instead of a literal list — the shape of
    * decontamination-style keyword sweeps with tens of thousands of
    * terms, where an `isin` literal would bloat the plan past codegen.
    *
    * Distributed shape: corpus statistics (N, avgdl) come from a narrow
    * id+length projection (column-pruned scan, 1-row broadcast frame);
    * the scoring pass explodes ALL tokens and broadcast-hash-joins the
    * (deduplicated) terms table — non-matching tokens die in the join's
    * build-side probe before any shuffle, so shuffled volume tracks
    * matches, exactly like the isin prune. Two corpus scans total (the
    * isin arm's persisted prune doesn't pay off here: persisting would
    * have to cache full token arrays, dwarfing the second scan). Final
    * top-k is the same partial sort-limit, never a global sort. */
  def bm25ScoreBatch(docs: DataFrame, idCol: String, textCol: String,
      terms: DataFrame, termCol: String, k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(k >= 1, "k >= 1")
    val toks = TextFunctions.tokens(col(textCol))
    val stats = docs.agg(count(lit(1)).as("_n"),
      sum(size(toks).cast("long")).as("_sumdl"))
    val tf = docs
      .select(col(idCol), size(toks).cast("long").as("_dl"), explode(toks).as("term"))
      .join(broadcast(terms.select(col(termCol).as("term")).distinct()), "term")
      .groupBy(col(idCol), col("_dl"), col("term")).agg(count(lit(1)).as("tf"))
    bm25ScoreTail(tf, stats, idCol, k, k1, b)
  }

  /** Inverted index over the corpus: one row per term with document
    * frequency, total term frequency, and a portable postings string
    * `"docId:tf,docId:tf,…"` ascending by doc id — the materialized
    * search-index artifact behind [[bm25Search]]. The postings encoding
    * is positional (`:` and `,` are structural), so `idCol` values must
    * render without either character — true for any numeric id; string
    * ids containing `:` or `,` would produce an unparseable postings
    * string and must be cleaned or re-keyed first. `minDf` drops hapax
    * noise; `maxPostings` caps each postings list to its first
    * `maxPostings` doc ids (real indexes shard or cap hot terms — a
    * stopword's full postings list at corpus scale is every doc; `df` and
    * `total_tf` always reflect the FULL corpus, only the stored list is
    * capped).
    *
    * Distributed shape: two keyed aggregations with map-side combine
    * ((term, doc) counts, then per-term fold). With a cap, rows beyond
    * the first `maxPostings` doc ids are EXCLUDED BEFORE the collect (a
    * per-term row_number over the same term partitioning — the exchange
    * is shared with the final aggregation), so a hot term's aggregation
    * state is bounded by the cap, not by its corpus frequency — capping
    * only the output string would leave the real hazard in place.
    * Postings are plain strings so any engine (and the DuckDB oracle)
    * can replay them byte-identically. The `docId:tf,docId:tf` encoding
    * string-casts ids UNescaped: ids must not contain ':' or ',' (numeric
    * ids always qualify; for free-form string ids, hash or re-key first)
    * or the postings string is unparseable. */
  def invertedIndex(docs: DataFrame, idCol: String, textCol: String,
      minDf: Int = 1, maxPostings: Int = Int.MaxValue): DataFrame = {
    require(minDf >= 1, "minDf >= 1")
    require(maxPostings >= 1, "maxPostings >= 1")
    val tf = docs
      .select(col(idCol), explode(TextFunctions.tokens(col(textCol))).as("term"))
      .groupBy(col("term"), col(idCol)).agg(count(lit(1)).as("_tf"))
    // collect_list drops nulls: posting entries past the cap become null
    // and never enter the aggregation buffer
    val entry = struct(col(idCol).as("d"), col("_tf").as("t"))
    val capped =
      if (maxPostings == Int.MaxValue) tf.withColumn("_e", entry)
      else tf.withColumn("_rn", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy("term").orderBy(idCol)))
        .withColumn("_e", when(col("_rn") <= maxPostings, entry))
    capped.groupBy("term")
      .agg(
        count(lit(1)).as("df"),
        sum("_tf").as("total_tf"),
        array_join(
          transform(array_sort(collect_list(col("_e"))),
            s => concat(s("d").cast("string"), lit(":"), s("t").cast("string"))),
          ",").as("postings"))
      .filter(col("df") >= minDf)
  }

  /** Corpus profile ("dataset datasheet") per stratum: document, token and
    * character totals, mean chars per doc, and token-count percentiles
    * (p50/p90) — the summary table a training-data pipeline publishes
    * alongside every corpus snapshot. One keyed aggregation.
    *
    * `exactPercentiles = true` (the oracle-checked gate setting) uses
    * Spark's linear-interpolation `percentile` (cross-engine
    * deterministic, the q22 convention) — whose aggregation state buffers
    * every value in the stratum, fine for datasheet-sized strata at gate
    * scale. At corpus scale a stratum is billions of docs, so `false`
    * switches to `approx_percentile` (Greenwald-Khanna, state bounded by
    * the accuracy parameter, rank error ≤ 1/10000) — same columns, sketch
    * semantics; the spec pins the approx values into the exact run's
    * rank-ε window. */
  def corpusProfile(docs: DataFrame, strata: Seq[String], textCol: String,
      exactPercentiles: Boolean = true): DataFrame = {
    require(strata.nonEmpty, "at least one stratum column")
    val nTok = TextFunctions.tokenCount(col(textCol))
    val pcts =
      if (exactPercentiles) percentile(nTok, array(lit(0.5), lit(0.9)))
      else approx_percentile(nTok.cast("double"), array(lit(0.5), lit(0.9)), lit(10000))
    docs.groupBy(strata.map(col): _*)
      .agg(
        count(lit(1)).as("n_docs"),
        sum(nTok.cast("long")).as("tokens"),
        sum(length(col(textCol)).cast("long")).as("chars"),
        pcts.as("_p"))
      .select(strata.map(col) ++ Seq(
        col("n_docs"), col("tokens"), col("chars"),
        Portable.ratio(col("chars"), col("n_docs")).as("chars_per_doc"),
        col("_p")(0).cast("double").as("p50_tokens"),
        col("_p")(1).cast("double").as("p90_tokens")): _*)
  }

  /** Corpus-level repeated spans: every stride-1 `span`-token window that
    * occurs in at least `minDocs` distinct documents, with its document
    * and occurrence counts — the boilerplate-discovery pass of a curation
    * pipeline (navigation chrome, license headers, share-buttons).
    * Explode + TWO-PHASE keyed aggregation — (span, doc) partial counts
    * combine map-side, then a plain per-span fold — rather than
    * `countDistinct + count` in one aggregate, which Catalyst plans as an
    * Expand that doubles the exploded span stream (measured 3.7 s → 0.2 s
    * at sf0.1). Candidate volume tracks corpus token count, never
    * document pairs. */
  def repeatedSpans(docs: DataFrame, idCol: String, textCol: String,
      span: Int, minDocs: Int): DataFrame = {
    require(span >= 1, "span >= 1")
    require(minDocs >= 2, "minDocs >= 2")
    explodedNgrams(docs, idCol, textCol, span, "span_text")
      .groupBy(col("span_text"), col(idCol)).agg(count(lit(1)).as("_occ"))
      .groupBy("span_text")
      .agg(count(lit(1)).as("n_docs"), sum("_occ").as("n_occ"))
      .filter(col("n_docs") >= minDocs)
  }

  /** Remove corpus-common spans from every document — the ACTIONABLE
    * sibling of [[repeatedSpans]]/[[boilerplateCoverage]]: instead of
    * scoring documents by boilerplate, strip the boilerplate and keep
    * the rest (the C4-style "remove the repeated line, keep the page"
    * pass). A token is removed iff it lies inside ANY `span`-token
    * window whose text appears in ≥ `minDocs` documents; survivors
    * reassemble in position order. Output: `(id, clean_text, n_tokens,
    * n_kept)` — a fully-boilerplate document keeps an empty string.
    *
    * Distributed shape: one positioned n-gram explode (persisted,
    * [[CacheScope]]-tracked — the common-span aggregation and the
    * coverage join both read it); common spans via the two-phase
    * distinct-doc count (never an Expand); covered token positions from
    * a span-length sequence explode, deduped by (doc, pos); survivors
    * are a LEFT ANTI join at token grain and reassembly is the q88
    * sorted-struct aggregation, bounded by each doc's own token count.
    * Volume tracks corpus tokens × span — never doc pairs. */
  def stripRepeatedSpans(docs: DataFrame, idCol: String, textCol: String,
      span: Int, minDocs: Int): DataFrame = {
    require(span >= 1, "span >= 1")
    require(minDocs >= 2, "minDocs >= 2")
    val toked = docs.select(col(idCol), TextFunctions.tokens(col(textCol)).as("_toks"))
    val grams = CacheScope.track(
      toked.select(col(idCol),
          posexplode(ngramArr(col("_toks"), span)).as(Seq("_gpos", "_gram")))
        .persist(StorageLevel.MEMORY_ONLY))
    val common = grams
      .groupBy(col("_gram"), col(idCol)).agg(count(lit(1)).as("_occ"))
      .groupBy(col("_gram")).agg(count(lit(1)).as("_nd"))
      .filter(col("_nd") >= minDocs)
      .select(col("_gram"))
    val covered = grams.join(common, Seq("_gram"))
      .select(col(idCol),
        explode(sequence(col("_gpos"), col("_gpos") + lit(span - 1))).as("_pos"))
      .distinct()
    val toks = toked.select(col(idCol), posexplode(col("_toks")).as(Seq("_pos", "_tok")))
    val rebuilt = toks.join(covered, Seq(idCol, "_pos"), "left_anti")
      .groupBy(col(idCol)).agg(
        array_join(transform(
          array_sort(collect_list(struct(col("_pos"), col("_tok")))),
          x => x("_tok")), " ").as("clean_text"),
        count(lit(1)).as("n_kept"))
    toked.select(col(idCol), size(col("_toks")).cast("long").as("n_tokens"))
      .join(rebuilt, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        col("n_tokens"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"))
  }

  /** Per-document boilerplate coverage: the fraction of each document's
    * `span`-token windows that are corpus-common (appear in ≥ `minDocs`
    * docs, per [[repeatedSpans]] semantics) — the per-doc signal that
    * turns span discovery into a drop/keep curation decision.
    *
    * The exploded span table feeds three consumers (common-span agg,
    * per-doc totals, the semi join), so it is persisted for the plan's
    * lifetime and registered with [[graft.CacheScope]] for deterministic
    * release; the common-span side joins as a LEFT SEMI shuffle join
    * (common spans scale with corpus vocabulary — never broadcast). */
  def boilerplateCoverage(docs: DataFrame, idCol: String, textCol: String,
      span: Int, minDocs: Int): DataFrame = {
    require(span >= 1, "span >= 1")
    require(minDocs >= 2, "minDocs >= 2")
    val spans = CacheScope.track(
      explodedNgrams(docs, idCol, textCol, span, "_s")
        .persist(StorageLevel.MEMORY_ONLY))
    val common = spans.groupBy(col("_s"), col(idCol)).agg(count(lit(1)).as("_o"))
      .groupBy("_s").agg(count(lit(1)).as("_nd"))
      .filter(col("_nd") >= minDocs)
      .select("_s")
    val totals = spans.groupBy(idCol).agg(count(lit(1)).as("n_spans"))
    val commons = spans.join(common, Seq("_s"), "left_semi")
      .groupBy(idCol).agg(count(lit(1)).as("n_common"))
    docs.select(col(idCol))
      .join(totals, Seq(idCol), "left")
      .join(commons, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("n_common"), lit(0L)).as("n_common"))
      .withColumn("coverage",
        when(col("n_spans") > 0, Portable.ratio(col("n_common"), col("n_spans"))))
  }

  /** Corpus-wide exact paragraph dedup — the sub-document granularity
    * of exact dedup (the C4/Dolma-style pass that strips a paragraph
    * repeated across pages while keeping its first occurrence): each
    * document is split on `sep`, a paragraph is kept only at its FIRST
    * corpus occurrence (min (doc, position) — deterministic), and each
    * document is reassembled from its surviving paragraphs in order.
    * Output: `(id, clean_text, n_paras, n_kept)`; a document whose every
    * paragraph appeared earlier elsewhere comes back empty.
    *
    * Distributed shape: explode paragraphs once into a persisted
    * ([[graft.CacheScope]]-tracked) table feeding both consumers; the
    * first-owner pass is ONE keyed aggregation with map-side `min`
    * partials — grouped on an md5 digest so the shuffle carries 16-byte
    * keys, not paragraph text (the [[graft.operators.Relational
    * .keepFirstBy]] trick at paragraph grain); survivors rejoin on the
    * digest and each document reassembles with one more keyed
    * aggregation (sorted struct array, bounded by the document's own
    * paragraph count). Never document-pair-shaped; volume tracks corpus
    * paragraphs. */
  def dedupParagraphs(docs: DataFrame, idCol: String, textCol: String,
      sep: String = "\\. ", joinSep: String = ". "): DataFrame =
    firstOwnerDedup(docs, idCol,
      docs.select(col(idCol),
          posexplode(split(col(textCol), sep)).as(Seq("_pos", "_unit")))
        .filter(length(col("_unit")) > 0),
      joinSep, totalCol = "n_paras")

  /** Shared core of [[dedupParagraphs]] and [[dedupSentences]]:
    * first-owner dedup over an exploded `(id, _pos, _unit)` table — the
    * only thing the two operators differ in is their unit splitter. One
    * persisted ([[graft.CacheScope]]-tracked) unit table feeds the
    * md5-keyed first-owner aggregation (16-byte shuffle keys, map-side
    * min partials), the per-doc totals, and the survivor join;
    * reassembly is one keyed sorted-struct aggregation bounded by each
    * doc's own unit count. Never doc-pair-shaped; volume tracks corpus
    * units. */
  private def firstOwnerDedup(docs: DataFrame, idCol: String,
      units: DataFrame, joinSep: String, totalCol: String): DataFrame = {
    val u = CacheScope.track(units
      .withColumn("_uk", md5(col("_unit")))
      .persist(StorageLevel.MEMORY_ONLY))
    val firstOwner = u.groupBy("_uk")
      .agg(min(struct(col(idCol).as("_oid"), col("_pos").as("_opos"))).as("_o"))
    val kept = u.join(firstOwner, Seq("_uk"))
      .filter(col(idCol) === col("_o._oid") && col("_pos") === col("_o._opos"))
    val totals = u.groupBy(idCol).agg(count(lit(1)).as(totalCol))
    val rebuilt = kept.groupBy(idCol).agg(
      array_join(transform(
        array_sort(collect_list(struct(col("_pos"), col("_unit")))),
        x => x("_unit")), joinSep).as("clean_text"),
      count(lit(1)).as("n_kept"))
    docs.select(col(idCol))
      .join(totals, Seq(idCol), "left")
      .join(rebuilt, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        coalesce(col(totalCol), lit(0L)).as(totalCol),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"))
  }

  /** Corpus-wide exact sentence dedup — [[dedupParagraphs]] at true
    * sentence grain: units come from [[splitSentences]] (terminator runs
    * stick to their sentence, so "One." and "One!" are DIFFERENT units —
    * a bare split-on-separator cannot represent that), a sentence
    * survives only at its FIRST corpus occurrence (min (doc, idx),
    * deterministic), and documents reassemble from survivors in order,
    * space-joined — the C4-style cross-page boilerplate-sentence pass.
    * Output: `(id, clean_text, n_sents, n_kept)`; a document whose every
    * sentence appeared earlier elsewhere comes back empty.
    *
    * Same distributed shape as [[dedupParagraphs]]: one persisted
    * ([[graft.CacheScope]]-tracked) sentence table feeds the md5-keyed
    * first-owner aggregation (16-byte shuffle keys, map-side min
    * partials) and the per-doc totals; reassembly is one more keyed
    * aggregation bounded by each doc's own sentence count. Never
    * doc-pair-shaped; volume tracks corpus sentences. */
  def dedupSentences(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    firstOwnerDedup(docs, idCol,
      splitSentences(docs, idCol, textCol)
        .select(col(idCol), col("sent_idx").as("_pos"), col("sentence").as("_unit")),
      joinSep = " ", totalCol = "n_sents")

  // URL surface shared with the oracle: scheme, optional userinfo
  // (swallowed so `https://innocent.com@bad.example.org/` cannot spoof
  // the host), host as group 1, then any non-space path. The host must
  // END on an alphanumeric — `[a-z0-9.-]+` would greedily capture the
  // sentence period in `https://bad.example.org. Then ...` as part of
  // the host, and "bad.example.org." escapes both the exact and the
  // `.domain` suffix match (a blocked domain passing the filter on any
  // sentence-final URL). Applied to LOWERCASED text — DNS hostnames are
  // case-insensitive, so `HTTPS://BAD.example.org` must match a
  // blocklist entry. Java∩RE2 syntax so DuckDB replays the same
  // matches; the q86 oracle interpolates THIS constant, so the two
  // engines cannot drift.
  val UrlRe = "https?://(?:[^\\s/@]*@)?([a-z0-9.-]*[a-z0-9])[^\\s]*"

  /** Domain-blocklist filter: per document, the number of URLs, the
    * number whose host is a blocked domain or any subdomain of one, and
    * the keep/drop verdict — the source-quality curation stage every
    * web-scale training pipeline runs (spam/adult/SEO domain lists).
    *
    * 100-TB shape: a pure per-row projection — hosts are extracted once
    * into an attribute (never recomputed inside the membership lambda —
    * the lambda-capture pitfall), and the blocklist compiles into the
    * plan as a codegen'd suffix-match condition per blocked domain
    * (domain lists are config-sized; a million-entry list would instead
    * broadcast-join the exploded hosts — same output, one explode).
    * Zero shuffle, whole-stage codegen, replayed exactly by the DuckDB
    * oracle (gate q86). */
  def urlBlocklistFilter(docs: DataFrame, idCol: String, textCol: String,
      blockedDomains: Seq[String]): DataFrame = {
    require(blockedDomains.nonEmpty, "blocked domain list required")
    require(blockedDomains.forall(_.trim.nonEmpty),
      "empty blocklist entry — an empty domain would suffix-match every host")
    val blocked = blockedDomains.map(_.toLowerCase)
    val isBlocked = (h: Column) => blocked.map(d =>
      h === d || h.endsWith("." + d)).reduce(_ || _)
    docs
      .select(col(idCol),
        regexp_extract_all(lower(col(textCol)), lit(UrlRe), lit(1)).as("_hosts"))
      .select(col(idCol),
        size(col("_hosts")).as("n_urls"),
        size(filter(col("_hosts"), isBlocked)).as("n_blocked"))
      .withColumn("keep", col("n_blocked") === 0)
  }

  /** Bigram language-model scoring — the CCNet-style perplexity filter
    * of a curation pipeline (filter/bucket documents by how surprising
    * they are under a language model; production pipelines use a
    * pre-trained KenLM — here the LM is an add-α bigram model trained
    * ON the corpus itself, so the whole train+score round trip is
    * deterministic and oracle-replayable, and self-perplexity is the
    * in-corpus outlier/repetition signal).
    *
    * Model: `P(w₁) = (c(w₁)+α)/(N+αV)`, `P(wᵢ|wᵢ₋₁) =
    * (c(wᵢ₋₁wᵢ)+α)/(c(wᵢ₋₁)+αV)` over whitespace tokens, where `N` =
    * total tokens, `V` = vocabulary size. Per document: `n_tokens`,
    * `nll_micro` = Σ round(10⁶·−ln P) (per-token quantization makes the
    * sum order-free and replayable — the q72 BM25 convention), and
    * `keep` = `nll_micro ≤ keepMaxMicroPerToken·n_tokens` (the mean-NLL
    * budget, compared in exact integer arithmetic — no division).
    *
    * Distributed shape: one corpus scan explodes (pos, cur, prev)
    * events (prev rides the projected token array — no window, no
    * self-join on position); the event table is persisted
    * ([[CacheScope]]-tracked) because four consumers read it: the
    * unigram aggregation, the bigram aggregation, and the two scoring
    * branches. Both model tables are map-side-combined keyed aggs —
    * state bounded by vocab (unigrams) and corpus-distinct bigrams, the
    * same scale story as any term aggregation; scoring joins events to
    * the bigram model on (prev,cur) — a plain shuffle hash join at
    * model scale, broadcast when the model is small — and to the
    * vocab-sized unigram table; the 1-row (N, V) stats frame
    * broadcasts. Model joins are LEFT with counts coalesced to 0, so an
    * event the model never saw scores P = α/(c+αV) — the add-α law —
    * rather than silently dropping (self-trained, every event matches
    * and the left joins behave as inner). */
  def ngramLmScore(docs: DataFrame, idCol: String, textCol: String,
      alpha: Double = 0.1,
      keepMaxMicroPerToken: Long = 10000000L): DataFrame = {
    // MEMORY_ONLY, not AND_DISK: the event table is corpus-token-scale,
    // and an evicted block should RECOMPUTE (a cheap projection) rather
    // than spill token rows to disk — the Dedup.shingled discipline
    val ev = CacheScope.track(
      lmEvents(docs, idCol, textCol).persist(StorageLevel.MEMORY_ONLY))
    lmScoreTail(ev, ev, idCol, alpha, keepMaxMicroPerToken)
  }

  /** [[ngramLmScore]] with the model trained on a separate STATIC
    * corpus: score `score` (batch or a STREAM — every stage on the
    * score side is a stateless projection, stream-static left join, or
    * the final per-doc aggregation) under the add-α bigram model of
    * `train`. Unseen words/bigrams score `P = α/(c+αV)` via the
    * coalesced left joins — the correct smoothed probability, so a
    * frozen yesterday-model scores today's stream without vocabulary
    * coupling. */
  def ngramLmScoreWith(score: DataFrame, train: DataFrame,
      idCol: String, textCol: String,
      alpha: Double = 0.1,
      keepMaxMicroPerToken: Long = 10000000L): DataFrame = {
    val trainEv = CacheScope.track(
      lmEvents(train, idCol, textCol).persist(StorageLevel.MEMORY_ONLY))
    lmScoreTail(lmEvents(score, idCol, textCol), trainEv, idCol,
      alpha, keepMaxMicroPerToken)
  }

  /** One row per (doc, position): current token plus its predecessor,
    * both riding the projected token array — no window, no self-join. */
  private def lmEvents(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol), TextFunctions.tokens(col(textCol)).as("_toks"))
      .select(col(idCol), col("_toks"),
        posexplode(col("_toks")).as(Seq("_p", "_cur")))
      .select(col(idCol), col("_p"), col("_cur"),
        when(col("_p") > 0, element_at(col("_toks"), col("_p"))).as("_prev"))

  private def lmScoreTail(scoreEv: DataFrame, trainEv: DataFrame,
      idCol: String, alpha: Double, keepMaxMicroPerToken: Long): DataFrame = {
    require(alpha > 0, "alpha > 0 (unsmoothed zero-probability events have no finite NLL)")
    val uni = trainEv.groupBy(col("_cur").as("_w")).agg(count(lit(1)).as("_cu"))
    val stats = uni.agg(sum(col("_cu")).as("_n"), count(lit(1)).as("_v"))
    val bi = trainEv.filter(col("_p") > 0)
      .groupBy(col("_prev").as("_bp"), col("_cur").as("_bc"))
      .agg(count(lit(1)).as("_cb"))
    def nllMicro(c: Column, den: Column): Column =
      round(lit(1e6) * -log((coalesce(c, lit(0L)).cast("double") + lit(alpha)) /
        (coalesce(den, lit(0L)).cast("double") +
          lit(alpha) * col("_v").cast("double")))).cast("long")
    val first = scoreEv.filter(col("_p") === 0)
      .join(uni, col("_cur") === col("_w"), "left")
      .crossJoin(broadcast(stats))
      .select(col(idCol), nllMicro(col("_cu"), col("_n")).as("_nll"))
    val rest = scoreEv.filter(col("_p") > 0)
      .join(bi, col("_prev") === col("_bp") && col("_cur") === col("_bc"), "left")
      .join(uni, col("_prev") === col("_w"), "left")
      .crossJoin(broadcast(stats))
      .select(col(idCol), nllMicro(col("_cb"), col("_cu")).as("_nll"))
    first.unionByName(rest)
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"), sum(col("_nll")).as("nll_micro"))
      .withColumn("keep",
        col("nll_micro") <= lit(keepMaxMicroPerToken) * col("n_tokens"))
  }

  /** Redact emails and phone numbers from a text column, counting each —
    * the PII-scrub stage of a curation pipeline. Emails are replaced
    * first (their local parts may contain digits/dashes that would
    * otherwise partially match the phone pattern), then phones — and
    * `n_phones` is counted on the email-redacted text so the counts
    * reconcile exactly with the `[EMAIL]`/`[PHONE]` tokens in
    * `clean_text` (counting phones on the raw text would report phantom
    * redactions for digit runs inside email local parts). */
  def redactPii(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol), col(textCol).as("_raw"),
        regexp_replace(col(textCol), EmailRe, "[EMAIL]").as("_deEmailed"))
      .select(
        col(idCol),
        regexp_count(col("_raw"), lit(EmailRe)).as("n_emails"),
        regexp_count(col("_deEmailed"), lit(PhoneRe)).as("n_phones"),
        regexp_replace(col("_deEmailed"), PhoneRe, "[PHONE]").as("clean_text"))

  /** Per-document TF-IDF keyword extraction: the top-`k` terms of every
    * document under `tf · (ln((N+1)/(df+1)) + 1)` (the smoothed-idf
    * convention, so a term in every document still scores > 0), micro-
    * quantized, ties broken by term — the corpus-exploration operator
    * behind "what is this document about" tagging and cluster labeling.
    * Distinct from [[bm25Search]]: no query — every document reports its
    * own highest-contrast terms. Output: `(id, term, tf, df,
    * score_micro)`, ≤ k rows per document.
    *
    * 100-TB shape: term frequencies are one keyed aggregation on
    * (doc, term) with map-side combine; document frequencies aggregate
    * THE SAME tf table (persisted MEMORY_ONLY, [[graft.CacheScope]]-
    * tracked — one tokenize pass, two consumers) by term; the (N) stats
    * frame is 1 row. The df join shuffles on term — vocab can exceed
    * broadcast size at corpus scale, so the honest equi-join, not a
    * forced broadcast — and the final per-doc top-k is
    * [[Relational.topKPerGroup]] partitioned by doc id: a doc's distinct
    * terms are bounded by its length, so the window partition can never
    * become a hot-key sort the way a corpus-wide stratum can. */
  def tfidfKeywords(docs: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame = {
    require(k >= 1, "k >= 1")
    val tf = CacheScope.track(docs
      .select(col(idCol), explode(TextFunctions.tokens(col(textCol))).as("term"))
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
      .persist(StorageLevel.MEMORY_ONLY))
    val n = docs.agg(count(lit(1)).as("_n"))
    val dfT = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val scored = tf.join(dfT, Seq("term"))
      .crossJoin(broadcast(n))
      .select(col(idCol), col("term"), col("tf"), col("df"),
        round(lit(1e6) * col("tf") *
          (log((col("_n") + 1.0) / (col("df") + 1.0)) + 1.0)).cast("long")
          .as("score_micro"))
    Relational.topKPerGroup(scored, Seq(col(idCol)),
      Seq(col("score_micro").desc, col("term").asc), k)
  }

  /** Hashed word bigrams of a document, bucketed to `buckets` features —
    * the DSIR feature map: `(id, _b)` one row per bigram OCCURRENCE
    * (bag semantics, not set). The bucket hash is the portable md5
    * 60-bit draw mod `buckets`, so the DuckDB oracle replays every
    * feature exactly. */
  private def bigramBuckets(docs: DataFrame, idCol: String, textCol: String,
      buckets: Int): DataFrame = {
    val toks = TextFunctions.tokens(col(textCol))
    docs.select(col(idCol), toks.as("_toks"))
      .select(col(idCol), explode(zip_with(
        slice(col("_toks"), lit(1), size(col("_toks")) - 1),
        slice(col("_toks"), lit(2), size(col("_toks")) - 1),
        (a, b) => concat_ws(" ", a, b))).as("_g"))
      .select(col(idCol),
        pmod(Portable.md5Long60(col("_g")), lit(buckets.toLong)).as("_b"))
  }

  /** DSIR-style data selection (Xie et al., "Data Selection for Language
    * Models via Importance Resampling", NeurIPS 2023): score every raw
    * document by how much more likely its hashed-bigram bag is under the
    * TARGET domain's unigram-over-buckets distribution than under the
    * raw corpus's own — `log p_target(doc) − log p_raw(doc)` for two
    * add-λ-smoothed bag-of-hashed-bigrams models — and keep the top `k`.
    * `gumbelTemp = 0` (default) takes the deterministic top-(score, id);
    * `gumbelTemp = τ > 0` is the paper's Gumbel top-k resample (a draw
    * of k docs without replacement ∝ exp(score/τ)), with the Gumbel
    * noise derived from a salted-md5 unit draw — seeded, so BOTH modes
    * replay exactly in the DuckDB oracle (gates q101/q105). Output:
    * `(id, n_grams, score_micro[, key_micro])` for the k selected
    * documents, descending by selection key. Documents with fewer than
    * two tokens have no features and are never selected (log-ratio 0 ≠
    * affinity).
    *
    * 100-TB shape: both corpora collapse to `buckets`-sized count
    * vectors (two keyed aggregations with map-side combine — the feature
    * hash is exactly what makes the model fixed-size no matter the
    * corpus); the per-bucket log-likelihood-ratio table (`buckets` rows,
    * micro-quantized integers) BROADCASTS to the scoring join, so the
    * raw corpus is never shuffled — one gram scan feeds both the raw
    * count vector and the per-doc scoring (persisted MEMORY_ONLY,
    * [[graft.CacheScope]]-tracked, the shingle-table discipline), and
    * the final top-k is a partial TakeOrdered, not a global sort. */
  def dsirScore(raw: DataFrame, target: DataFrame, idCol: String,
      textCol: String, buckets: Int = 4096, lambda: Double = 1.0,
      k: Int = 100, gumbelTemp: Double = 0.0): DataFrame = {
    require(buckets >= 2, "buckets >= 2")
    require(lambda > 0, "lambda > 0 (unsmoothed zero-count buckets have log 0)")
    require(k >= 1, "k >= 1")
    require(gumbelTemp >= 0, "gumbelTemp >= 0 (0 = deterministic top-k)")
    val rawG = CacheScope.track(bigramBuckets(raw, idCol, textCol, buckets)
      .persist(StorageLevel.MEMORY_ONLY))
    val tgtC = bigramBuckets(target, idCol, textCol, buckets)
      .groupBy("_b").agg(count(lit(1)).as("_ct"))
    val rawC = rawG.groupBy("_b").agg(count(lit(1)).as("_cr"))
    // totals as a 1-row frame (the BM25 stats-frame idiom); buckets the
    // raw corpus never emits cannot be probed, so rawC is the base
    val stats = rawC.agg(sum("_cr").as("_tr"))
      .crossJoin(tgtC.agg(coalesce(sum("_ct"), lit(0L)).as("_tt")))
    val lb = lit(lambda * buckets)
    val llr = rawC.join(tgtC, Seq("_b"), "left")
      .select(col("_b"), col("_cr"), coalesce(col("_ct"), lit(0L)).as("_ct"))
      .crossJoin(broadcast(stats))
      .select(col("_b"),
        round(lit(1e6) * (
          log((col("_ct") + lambda) / (col("_tt") + lb)) -
          log((col("_cr") + lambda) / (col("_tr") + lb)))).cast("long")
          .as("_llr_micro"))
    val scored = rawG.join(broadcast(llr), Seq("_b"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"), sum(col("_llr_micro")).as("score_micro"))
    if (gumbelTemp == 0.0)
      scored.orderBy(col("score_micro").desc, col(idCol)).limit(k)
    else {
      // The paper's Gumbel top-k resample (top-k of score/τ + Gumbel ~
      // sampling k docs WITHOUT replacement ∝ exp(score/τ)), with the
      // Gumbel draw from the salted-md5 unit draw (the weightedMixture
      // idiom) so any engine replays the sample: u = (h + 0.5)/2^60 ∈
      // (0,1) — the half-offset keeps u off both endpoints where
      // -ln(-ln u) diverges. key = score + τ·g in micro units.
      val u = (Portable.md5Long60(concat(col(idCol).cast("string"), lit("#gumbel")))
        .cast("double") + 0.5) / lit(math.pow(2, 60))
      scored
        .withColumn("key_micro", col("score_micro") +
          round(lit(1e6 * gumbelTemp) * -log(-log(u))).cast("long"))
        .orderBy(col("key_micro").desc, col(idCol))
        .limit(k)
    }
  }

  /** Winnowing document fingerprints (Schleimer, Wilkerson, Aiken —
    * SIGMOD 2003, the MOSS algorithm): hash every token `k`-gram, slide a
    * window of `w` consecutive hashes, keep the MINIMUM of each window,
    * dedup. The guarantee: any two documents sharing a token run of at
    * least `w + k − 1` tokens share at least one fingerprint — so
    * CONTAINED copies (a paragraph lifted into an otherwise-different
    * page) are caught, which whole-document Jaccard structurally misses —
    * while only ~2/(w+1) of positions are kept (the winnowing density
    * bound), an order-of-magnitude smaller posting table than full
    * shingling.
    *
    * Documents with fewer than `w` k-grams emit NO fingerprints (no full
    * window exists) — by contract; overlap auditing targets substantial
    * documents, and tiny ones are exact-dedup territory.
    *
    * Shape: tokenize once, positioned k-gram hashes (md5-based — any
    * engine replays them), per-doc window MIN over the next `w` hashes
    * (doc partitions are length-bounded, never hot), distinct. Output:
    * (id, `fingerprint`).
    */
  def winnowFingerprints(docs: DataFrame, idCol: String, textCol: String,
      k: Int, w: Int): DataFrame = {
    require(k >= 1, "k >= 1")
    require(w >= 1, "w >= 1")
    // gram count from the token count (never from a second ngram array),
    // and the ngram transform consumed INSIDE the generator: a plain
    // Project chain would collapse and inline the tokenizer into the
    // per-element lambda — the measured 4-6× lambda-capture pitfall
    // (COVERAGE.md scale notes; explodedNgrams' discipline)
    val g = docs.select(col(idCol), TextFunctions.tokens(col(textCol)).as("_toks"))
      .select(col(idCol), (size(col("_toks")) - (k - 1)).as("_ng"),
        posexplode(ngramArr(col("_toks"), k)).as(Seq("_p", "_g")))
      .select(col(idCol), col("_ng"), col("_p"),
        Portable.md5Long60(col("_g")).as("_h"))
    val windowMin = min(col("_h")).over(
      org.apache.spark.sql.expressions.Window
        .partitionBy(col(idCol)).orderBy(col("_p")).rowsBetween(0, w - 1))
    g.withColumn("_mh", windowMin)
      .filter(col("_p") <= col("_ng") - w) // full w-hash windows only (0-based)
      .select(col(idCol), col("_mh").as("fingerprint"))
      .distinct()
  }

  /** Partial-overlap candidate pairs via [[winnowFingerprints]]: document
    * pairs sharing at least `minShared` winnowed fingerprints — the
    * plagiarism/lifted-passage sweep. One fingerprint-keyed equi
    * self-join over the (small, winnowed) posting table; per-key rows =
    * docs sharing that fingerprint, so candidate volume tracks real
    * overlap (boilerplate-heavy keys are exactly the pairs the audit
    * exists to surface). Output: (id_a, id_b, shared_fingerprints),
    * id_a < id_b. */
  def winnowOverlapPairs(docs: DataFrame, idCol: String, textCol: String,
      k: Int, w: Int, minShared: Int): DataFrame = {
    require(minShared >= 1, "minShared >= 1")
    val f = CacheScope.track(winnowFingerprints(docs, idCol, textCol, k, w)
      .persist(StorageLevel.MEMORY_ONLY))
    f.select(col(idCol).as("id_a"), col("fingerprint"))
      .join(f.select(col(idCol).as("id_b"), col("fingerprint")), Seq("fingerprint"))
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("shared_fingerprints"))
      .filter(col("shared_fingerprints") >= minShared)
  }

  /** Incremental winnowing sweep — today's crawl against the persisted
    * fingerprint store ([[winnowFingerprints]] rows written at ingest
    * time): increment docs are winnowed fresh, then meet the store in
    * ONE fingerprint-keyed equi-join; history TEXT is never rescanned
    * (the q90/q106 incremental discipline — the store is the ~2/(w+1)
    * winnowed density, far below shingle volume). Output:
    * (id, hist_id, shared_fingerprints) at `minShared`+. In production
    * the store is bucketed by fingerprint so only the increment
    * shuffles. */
  def winnowIncremental(increment: DataFrame, idCol: String, textCol: String,
      store: DataFrame, storeIdCol: String, fpCol: String,
      k: Int, w: Int, minShared: Int): DataFrame = {
    require(minShared >= 1, "minShared >= 1")
    winnowFingerprints(increment, idCol, textCol, k, w)
      .join(store.select(col(storeIdCol).as("hist_id"),
        col(fpCol).as("fingerprint")), Seq("fingerprint"))
      .groupBy(col(idCol), col("hist_id"))
      .agg(count(lit(1)).as("shared_fingerprints"))
      .filter(col("shared_fingerprints") >= minShared)
  }

  /** Multinomial Naive Bayes text classifier, trained and applied in one
    * plan — the fastText-shaped "train a label/quality classifier on a
    * labeled slice, score the rest of the corpus" stage of a curation
    * pipeline (quality filtering à la GPT-3/LLaMA data prep, domain
    * routing, language verification), with the model fully
    * deterministic: add-α class-conditional token likelihoods + doc-count
    * priors, all micro-quantized to longs BEFORE summation (the
    * [[ngramLmScore]] convention) so scores replay bit-for-bit in any
    * engine.
    *
    * Shape for 100 TB: the MODEL is aggregate-sized — class priors and
    * token totals ride a broadcast K-row frame; the class-conditional
    * count table joins the scoring events by (label, token) equi-key
    * (vocab-scale, shuffles with the events — never collected to the
    * driver). Scoring expands each token event × K classes (the honest
    * multinomial-NB cost, map-side) and reduces by (doc, class) with
    * partial aggregation; the final argmax is a bounded K-element
    * lexicographic-min aggregation, not a window sort. Unseen tokens get
    * the correct smoothed α/(n_c + αV) likelihood via the coalesced left
    * join, so a frozen model scores unseen-vocabulary documents without
    * retraining.
    *
    * Output: id, `label_pred`, `score_micro` (winning log-posterior in
    * micro-nats), `margin_micro` (win minus runner-up — the calibration
    * signal a thresholding quality filter consumes; null iff one class).
    * Ties break to the lexicographically smallest label.
    */
  def nbTrainScore(train: DataFrame, score: DataFrame, idCol: String,
      textCol: String, labelCol: String, alpha: Double = 1.0): DataFrame = {
    require(alpha > 0, "alpha > 0 (unsmoothed unseen tokens have log 0)")
    val trainEv = train.select(col(labelCol).as("_lbl"),
      explode(TextFunctions.tokens(col(textCol))).as("_t"))
    // ONE token-scale aggregation over the training text; totals and
    // vocab derive from the persisted count table (the nbTrain pattern)
    val classTok = CacheScope.track(
      trainEv.groupBy("_lbl", "_t").agg(count(lit(1)).as("_cwt"))
        .persist(StorageLevel.MEMORY_ONLY))
    val classTot = classTok.groupBy("_lbl").agg(sum("_cwt").as("_nt"))
    val priors = train.groupBy(col(labelCol).as("_lbl")).agg(count(lit(1)).as("_nd"))
    val nDocs = priors.agg(sum("_nd").as("_ndocs"))
    val vocab = classTok.select("_t").distinct().agg(count(lit(1)).as("_v"))
    val classes = classTot.join(priors, Seq("_lbl"))
      .crossJoin(broadcast(nDocs))
      .select(col("_lbl"), col("_nt"),
        round(lit(1e6) * log(Portable.ratio(col("_nd"), col("_ndocs"))))
          .cast("long").as("_prior_micro"))
    val ev = score.select(col(idCol),
      explode(TextFunctions.tokens(col(textCol))).as("_t"))
    val perClass = ev
      .crossJoin(broadcast(classes))
      .join(classTok, Seq("_lbl", "_t"), "left")
      .crossJoin(broadcast(vocab))
      .select(col(idCol), col("_lbl"), col("_prior_micro"),
        round(lit(1e6) * log(
          (coalesce(col("_cwt"), lit(0L)).cast("double") + lit(alpha)) /
            (col("_nt").cast("double") + lit(alpha) * col("_v").cast("double"))))
          .cast("long").as("_ll"))
      .groupBy(col(idCol), col("_lbl"), col("_prior_micro"))
      .agg(sum(col("_ll")).as("_sumll"))
      .select(col(idCol), col("_lbl"),
        (col("_prior_micro") + col("_sumll")).as("_post"))
    // argmax(post desc, label asc) == lexicographic MIN of (-post, label):
    // a bounded K-element aggregation, never a per-doc window sort
    perClass.groupBy(col(idCol))
      .agg(
        min(struct((-col("_post")).as("_np"), col("_lbl").as("_l"))).as("_best"),
        sort_array(collect_list(
          struct((-col("_post")).as("_np"), col("_lbl").as("_l")))).as("_all"))
      .select(col(idCol),
        col("_best._l").as("label_pred"),
        (-col("_best._np")).as("score_micro"),
        // guarded: a single-class model has no runner-up — margin is null
        // by contract, and an unguarded element_at(_, 2) would THROW
        // under ANSI mode rather than return it
        (when(size(col("_all")) > 1,
          element_at(col("_all"), 2)("_np") - col("_best._np"))).as("margin_micro"))
  }

  /** A frozen Naive Bayes model: K class rows (label, token total, prior)
    * collected driver-side (model-sized, the BPE-merges/PQ-codebook
    * convention), the train vocab size, and the class-conditional count
    * table pivoted WIDE — one row per token, one count column per class.
    * The wide layout is what makes [[nbScoreWith]] streamable: classes
    * are plan-time literals, so scoring needs ONE stateful aggregation
    * instead of a per-(doc, class) aggregation stacked under an argmax
    * aggregation (two stacked stateful aggs — unsupported in Structured
    * Streaming). */
  final case class NbModel(
      classes: Seq[(String, Long, Long)], // (label, nTokens, priorMicro)
      vocab: Long,
      wideCounts: DataFrame, // _t, _cwt_0 .. _cwt_{K-1}
      alpha: Double)

  /** Train the [[NbModel]] on a labeled static corpus. One token-scale
    * aggregation; the pivot runs over the (label, token) count table
    * (vocab-scale, stays distributed); only the K class rows and the
    * vocab size are fetched to the driver. */
  def nbTrain(train: DataFrame, textCol: String, labelCol: String,
      alpha: Double = 1.0): NbModel = {
    require(alpha > 0, "alpha > 0 (unsmoothed unseen tokens have log 0)")
    val trainEv = train.select(col(labelCol).as("_lbl"),
      explode(TextFunctions.tokens(col(textCol))).as("_t"))
    val counts = CacheScope.track(
      trainEv.groupBy("_lbl", "_t").agg(count(lit(1)).as("_cwt"))
        .persist(StorageLevel.MEMORY_ONLY))
    val nDocs = train.count()
    val classRows = counts.groupBy("_lbl").agg(sum("_cwt").as("_nt"))
      .join(train.groupBy(col(labelCol).as("_lbl")).agg(count(lit(1)).as("_nd")), Seq("_lbl"))
      .collect().map { r =>
        // HALF_UP (away from zero), NOT math.round (half toward +inf):
        // priors are negative and both Spark's round() and DuckDB round
        // half-exact negatives AWAY from zero — the joint plan, the
        // oracle, and this frozen model must quantize identically
        (r.getString(0), r.getLong(1),
          BigDecimal(1e6 * math.log(r.getLong(2).toDouble / nDocs))
            .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong)
      }.sortBy(_._1).toSeq
    val vocab = counts.select("_t").distinct().count()
    val cwtCols = classRows.zipWithIndex.map { case ((lbl, _, _), i) =>
      sum(when(col("_lbl") === lbl, col("_cwt"))).as(s"_cwt_$i")
    }
    val wide = counts.groupBy("_t").agg(cwtCols.head, cwtCols.tail: _*)
    NbModel(classRows, vocab, wide, alpha)
  }

  /** Score a frame — batch or a STREAM — under a frozen [[NbModel]]:
    * token explode (stateless) → stream-static left join against the
    * wide count table → ONE per-doc aggregation summing K quantized
    * class log-likelihood columns → argmax as a pure projection
    * (`sort_array` over a K-literal struct array). Identical scores to
    * [[nbTrainScore]] by construction (same quantization per token, same
    * coalesced smoothing, same (post desc, label asc) tie-break) — the
    * frozen-model twin for scoring today's crawl under yesterday's
    * classifier. */
  def nbScoreWith(score: DataFrame, idCol: String, textCol: String,
      model: NbModel): DataFrame = {
    require(model.classes.nonEmpty, "model must carry at least one class")
    val ev = score.select(col(idCol),
      explode(TextFunctions.tokens(col(textCol))).as("_t"))
    val lls = model.classes.zipWithIndex.map { case ((_, nt, _), i) =>
      round(lit(1e6) * log(
        (coalesce(col(s"_cwt_$i"), lit(0L)).cast("double") + lit(model.alpha)) /
          (lit(nt).cast("double") + lit(model.alpha) * lit(model.vocab).cast("double"))))
        .cast("long").as(s"_ll_$i")
    }
    val summed = ev.join(model.wideCounts, Seq("_t"), "left")
      .select(col(idCol) +: lls: _*)
      .groupBy(col(idCol))
      .agg(sum(col("_ll_0")).as("_s_0"),
        model.classes.indices.drop(1).map(i => sum(col(s"_ll_$i")).as(s"_s_$i")): _*)
    val posts = model.classes.zipWithIndex.map { case ((lbl, _, prior), i) =>
      struct((-(col(s"_s_$i") + lit(prior))).as("_np"), lit(lbl).as("_l"))
    }
    summed
      .withColumn("_sorted", sort_array(array(posts: _*)))
      .select(col(idCol),
        col("_sorted")(0)("_l").as("label_pred"),
        (-col("_sorted")(0)("_np")).as("score_micro"),
        (when(lit(model.classes.size > 1),
          col("_sorted")(1)("_np") - col("_sorted")(0)("_np"))).as("margin_micro"))
  }

  /** Per-group token-distribution drift from the corpus mixture: for
    * every `groupCol` value, the add-α smoothed KL divergence
    * D(P_group ‖ P_corpus) and total-variation distance ½Σ|p_g − p_c|
    * over hashed-unigram buckets — the mixture diagnostic behind "which
    * source moved away from the training mix" monitoring and re-weighting
    * decisions (a new crawl snapshot whose drift jumps is the first
    * thing a pipeline owner wants flagged).
    *
    * Shape for 100 TB: one token scan builds the sparse (group, bucket)
    * counts (map-side combinable); everything after runs on
    * AGGREGATE-sized frames — the dense evaluation grid is
    * groups × observed-buckets (≤ `buckets`, a constant), built by
    * cross-joining two already-aggregated frames, never by touching
    * token rows again. The buckets NO corpus token hashes into share one
    * closed-form contribution per group ((B−observed) identical smoothed
    * terms), added analytically — the sum is over the full bucket space
    * without materializing it.
    *
    * Every per-bucket contribution is nano-quantized to a long BEFORE
    * summation (the [[ngramLmScore]] convention, at 1e9 grain because
    * individual terms are O(1/buckets)): integer sums are
    * order-independent, so the export replays bit-for-bit in any engine.
    * Output: group, n_tokens, kl_nano, tv_nano.
    */
  def unigramDrift(docs: DataFrame, groupCol: String, textCol: String,
      buckets: Int = 4096, alpha: Double = 1.0): DataFrame = {
    require(buckets >= 2, "buckets >= 2")
    require(alpha > 0, "alpha > 0 (unsmoothed empty buckets have log 0)")
    val tb = docs.select(col(groupCol).as("_grp"),
        explode(TextFunctions.tokens(col(textCol))).as("_t"))
      .select(col("_grp"),
        pmod(Portable.md5Long60(col("_t")), lit(buckets.toLong)).as("_b"))
    // one pass over token rows; gc is the only token-scale aggregation —
    // corpus counts and group totals both derive from it
    val gc = CacheScope.track(
      tb.groupBy("_grp", "_b").agg(count(lit(1)).as("_cg"))
        .persist(StorageLevel.MEMORY_ONLY))
    val cc = gc.groupBy("_b").agg(sum("_cg").as("_cc"))
    val gt = gc.groupBy("_grp").agg(sum("_cg").as("_ng"))
    val stats = cc.agg(sum("_cc").as("_n"), count(lit(1)).as("_nobs"))
    val aB = lit(alpha * buckets)
    def pg(cg: Column) =
      (coalesce(cg, lit(0L)).cast("double") + lit(alpha)) /
        (col("_ng").cast("double") + aB)
    val pc = (col("_cc").cast("double") + lit(alpha)) /
      (col("_n").cast("double") + aB)
    val observed = gt
      .crossJoin(broadcast(cc)) // K groups × ≤`buckets` rows — aggregate-sized
      .join(gc, Seq("_grp", "_b"), "left")
      .crossJoin(broadcast(stats))
      .select(col("_grp"), col("_ng"),
        round(lit(1e9) * pg(col("_cg")) * (log(pg(col("_cg"))) - log(pc)))
          .cast("long").as("_kl"),
        round(lit(1e9) * lit(0.5) * abs(pg(col("_cg")) - pc))
          .cast("long").as("_tv"))
      .groupBy(col("_grp"), col("_ng"))
      .agg(sum(col("_kl")).as("_klObs"), sum(col("_tv")).as("_tvObs"))
    // buckets the whole corpus never emits: identical smoothed term for
    // every one of them — one rounded value × the missing count, exact
    val pg0 = lit(alpha) / (col("_ng").cast("double") + aB)
    val pc0 = lit(alpha) / (col("_n").cast("double") + aB)
    observed.crossJoin(broadcast(stats))
      .select(col("_grp").as(groupCol), col("_ng").as("n_tokens"),
        (col("_klObs") + (lit(buckets) - col("_nobs")) *
          round(lit(1e9) * pg0 * (log(pg0) - log(pc0))).cast("long")).as("kl_nano"),
        (col("_tvObs") + (lit(buckets) - col("_nobs")) *
          round(lit(1e9) * lit(0.5) * abs(pg0 - pc0)).cast("long")).as("tv_nano"))
  }

  /** Length-bucketed batch assignment: group rows into fixed-size
    * training batches of SIMILAR sequence length, so per-batch padding
    * waste is bounded by the bucket width instead of the corpus-wide
    * length spread (the dynamic-batching trick every trainer applies
    * before padding to the batch max). `bucketEdges` are ascending
    * upper-exclusive boundaries: bucket i holds rows with
    * `edges(i-1) <= tokens < edges(i)`; rows at or past the last edge
    * fall in the overflow bucket `edges.size`. Within a bucket, rows
    * order by the salted content hash of `idCol` (deterministic,
    * engine-replayable, growth-churn limited — no `rand()`), and
    * `batch_id` / `pos` are the rank split into `batchSize` groups; the
    * tail batch of each bucket may be short. Output: input columns +
    * `bucket`, `batch_id`, `pos` (both 0-based, per bucket).
    *
    * Shape: bucket assignment is a pure projection (config-sized
    * `when`-ladder); the rank is ONE bucket-keyed window under the hash
    * order. Buckets are the operator's parallelism unit — a
    * billion-row bucket's single-task sort is the q80 window-path
    * caveat, and the same remedy applies (pre-shard hot buckets by a
    * hash prefix, or pack per [[Relational.epochShuffle]] shards). */
  def lengthBucketBatches(df: DataFrame, idCol: String, tokensCol: String,
      bucketEdges: Seq[Long], batchSize: Int): DataFrame = {
    require(bucketEdges.nonEmpty && bucketEdges == bucketEdges.sorted &&
      bucketEdges.distinct.size == bucketEdges.size,
      "bucketEdges must be ascending and distinct")
    require(batchSize >= 1, "batchSize >= 1")
    val toks = col(tokensCol).cast("long")
    // a NULL token count would fall through every `toks < edge` branch
    // into the overflow bucket — silently padding junk rows to the
    // longest band; fail loudly instead (costs nothing on clean data)
    val bucket = when(toks.isNull, raise_error(lit(
        s"lengthBucketBatches: NULL $tokensCol — filter or impute before batching")))
      .otherwise(bucketEdges.zipWithIndex.foldRight(lit(bucketEdges.size)) {
        case ((edge, i), rest) => when(toks < edge, i).otherwise(rest)
      })
    val ord = graft.functions.Portable.md5Long60(
      concat(col(idCol).cast("string"), lit("#batch")))
    val rank = row_number().over(org.apache.spark.sql.expressions.Window
      .partitionBy(col("bucket")).orderBy(ord, col(idCol))) - 1
    df.withColumn("bucket", bucket)
      .withColumn("batch_id", (rank - pmod(rank, lit(batchSize))) / batchSize)
      .withColumn("batch_id", col("batch_id").cast("long"))
      .withColumn("pos", pmod(rank, lit(batchSize)))
  }

  /** Classifier calibration / reliability curve: join a scored frame
    * against the true labels, bucket by score into `nBins` EQUAL-WIDTH
    * bins over the observed [min, max] score range, and report per bin
    * the count, correct count, and exact integer-micro accuracy — the
    * reliability diagram that tells a curation pipeline whether a
    * quality/language classifier's confidence is trustworthy enough to
    * threshold on. Output: `(bin, n, n_correct, acc_micro, min_score,
    * max_score)`.
    *
    * Equal-WIDTH (not equal-count) bins on purpose: exact quantile bins
    * need a global sort (`ntile` over one partition — the scale
    * killer); width bins are a two-row stats aggregate broadcast into a
    * pure projection, and the bin rule
    * `(s − lo)·nBins div (hi − lo + 1)` is exact integer arithmetic any
    * engine replays (a degenerate one-value range collapses to bin 0).
    * Empty bins are absent from the output (they have no rows to carry).
    * `scoreCol` must be integral — micro-unit scores, the
    * [[graft.functions.Portable]] rule. */
  def calibrationCurve(scored: DataFrame, idCol: String, predCol: String,
      scoreCol: String, truth: DataFrame, truthIdCol: String,
      truthLabelCol: String, nBins: Int = 10): DataFrame = {
    require(nBins >= 2, "nBins >= 2")
    // the joined/scored frame feeds BOTH the min/max stats aggregate and
    // the binning branch — cached, or the whole upstream scoring lineage
    // (in q152: the full NB train+score chain) would execute twice
    val j = graft.CacheScope.track(
      scored.select(col(idCol).as("_id"), col(predCol).as("_pred"),
          col(scoreCol).cast("long").as("_s"))
        .join(truth.select(col(truthIdCol).as("_id"),
          col(truthLabelCol).as("_true")), Seq("_id"))
        .withColumn("_ok", (col("_pred") === col("_true")).cast("long"))
        .cache())
    val stats = j.agg(min(col("_s")).as("_lo"), max(col("_s")).as("_hi"))
    val num = (col("_s") - col("_lo")) * nBins
    val den = col("_hi") - col("_lo") + 1
    val accNum = lit(1000000L) * col("n_correct")
    j.crossJoin(broadcast(stats))
      .withColumn("bin", when(col("_hi") === col("_lo"), lit(0))
        .otherwise(((num - pmod(num, den)) / den).cast("int")))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"), sum(col("_ok")).as("n_correct"),
        min(col("_s")).as("min_score"), max(col("_s")).as("max_score"))
      .select(col("bin"), col("n"), col("n_correct"),
        ((accNum - pmod(accNum, col("n"))) / col("n")).cast("long").as("acc_micro"),
        col("min_score"), col("max_score"))
  }

  /** T5/UL2-style span corruption: mask ~`maskPct`% of each document's
    * tokens in `spanLen`-token blocks, replace each maximal masked RUN
    * with a numbered sentinel in the corrupted text, and emit the
    * sentinel-prefixed spans as the target sequence — the
    * denoising-objective transform, content-addressed like
    * [[Relational.fimTransform]] so the same doc always corrupts the
    * same way (md5 of (id, block, salt); no `rand()`, engine-portable).
    *
    * Output per doc: `corrupted`, `targets`, `n_masked`, `n_spans`.
    * Adjacent masked blocks merge into one span (standard span-corruption
    * semantics); sentinels number `<X0>`, `<X1>`, … in document order.
    *
    * Scale shape: tokenize once, posexplode, ONE doc-keyed Exchange
    * feeding the run-detection window (lag + running span count, both
    * bounded by a doc's own tokens), and the reassembly aggregation
    * REUSES that partitioning — one shuffle end to end, reassembly via
    * sorted-struct array_join exactly like sentence dedup's. */
  def spanCorrupt(docs: DataFrame, idCol: String, textCol: String,
      maskPct: Int = 15, spanLen: Int = 3, salt: String = "t5"): DataFrame = {
    require(maskPct >= 0 && maskPct <= 100, "maskPct in [0,100]")
    require(spanLen >= 1, "spanLen >= 1")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("_idx"))
    val run = w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
      org.apache.spark.sql.expressions.Window.currentRow)
    val tk = docs
      .select(col(idCol), posexplode(graft.functions.TextFunctions.tokens(col(textCol)))
        .as(Seq("_idx", "_tok")))
      .withColumn("_blk", expr(s"_idx div $spanLen"))
      .withColumn("_m", pmod(graft.functions.Portable.md5Long60(
        concat(col(idCol).cast("string"), lit("|"), col("_blk").cast("string"),
          lit("|"), lit(salt))), lit(100)) < maskPct)
    val spans = tk
      .withColumn("_st", (col("_m") && !coalesce(lag(col("_m"), 1).over(w), lit(false))).cast("int"))
      .withColumn("_k", sum(col("_st")).over(run).cast("int") - 1)
    val sentinel = concat(lit("<X"), col("_k").cast("string"), lit(">"))
    def joinSorted(piece: org.apache.spark.sql.Column) =
      array_join(transform(array_sort(collect_list(when(piece.isNotNull,
        struct(col("_idx"), piece.as("_p"))))), e => e("_p")), " ")
    spans.groupBy(col(idCol)).agg(
      joinSorted(when(!col("_m"), col("_tok"))
        .when(col("_st") === 1, sentinel)).as("corrupted"),
      joinSorted(when(col("_m") && col("_st") === 1, concat(sentinel, lit(" "), col("_tok")))
        .when(col("_m"), col("_tok"))).as("targets"),
      sum(col("_m").cast("long")).as("n_masked"),
      sum(col("_st").cast("long")).as("n_spans"))
  }

  /** ROUGE-N overlap scores for a given pair list — the n-gram
    * precision/recall/F1 an eval harness computes between candidate and
    * reference texts (summarization eval, near-dup audit, decontamination
    * triage). For each `(aCol, bCol)` pair and each n in `ns`, emits
    * `rouge{n}_p_micro / _r_micro / _f_micro` where
    * precision = clipped matches / candidate grams, recall = clipped
    * matches / reference grams, and "clipped" is the MULTISET
    * intersection (per gram, min of the two occurrence counts — the
    * ROUGE definition; a distinct-set intersection would overcount
    * repeated grams). All three ride as integral micro-units computed
    * with integer division only — `p = (1e6·m) div t` — so results are
    * bit-identical in any engine.
    *
    * Scale shape: gram tables are built ONLY for docs that appear in the
    * pair list (semi join first), tokenized once per doc and cached
    * across the n values; per n the pair list joins the a-side gram
    * table on id then the b-side on (id, gram) — work is
    * Σ_pairs |grams(a)|, never corpus². Pairs with zero shared grams
    * score 0 (left join + coalesce), they are not dropped.
    */
  def rougeScores(docs: DataFrame, idCol: String, textCol: String,
      pairs: DataFrame, aCol: String, bCol: String,
      ns: Seq[Int] = Seq(1, 2)): DataFrame = {
    require(ns.nonEmpty && ns.forall(_ >= 1), "ns: non-empty, each >= 1")
    val p = graft.CacheScope.track(
      pairs.select(col(aCol).cast("long").as("id_a"), col(bCol).cast("long").as("id_b"))
        .cache())
    val members = p.select(col("id_a").as("_m")).union(p.select(col("id_b"))).distinct()
    val toks = graft.CacheScope.track(
      docs.join(members, col(idCol).cast("long") === col("_m"), "left_semi")
        .select(col(idCol).cast("long").as("_id"),
          graft.functions.TextFunctions.tokens(col(textCol)).as("_toks"))
        .cache())
    var out = p
    for (n <- ns) {
      val counts = graft.CacheScope.track(
        toks.select(col("_id"), explode(ngramArr(col("_toks"), n)).as("_g"))
          .groupBy("_id", "_g").agg(count(lit(1)).as("_c"))
          .cache())
      val totals = counts.groupBy("_id").agg(sum(col("_c")).as("_t"))
      val matches = p
        .join(counts.select(col("_id").as("id_a"), col("_g"), col("_c").as("_ca")), Seq("id_a"))
        .join(counts.select(col("_id").as("id_b"), col("_g"), col("_c").as("_cb")),
          Seq("id_b", "_g"))
        .groupBy("id_a", "id_b")
        .agg(sum(least(col("_ca"), col("_cb"))).as("_m"))
      val pr = out
        .join(matches, Seq("id_a", "id_b"), "left")
        .join(totals.select(col("_id").as("id_a"), col("_t").as("_ta")), Seq("id_a"), "left")
        .join(totals.select(col("_id").as("id_b"), col("_t").as("_tb")), Seq("id_b"), "left")
        .withColumn(s"rouge${n}_p_micro",
          when(col("_ta") > 0, expr("(1000000 * coalesce(_m, 0L)) div _ta")).otherwise(0L))
        .withColumn(s"rouge${n}_r_micro",
          when(col("_tb") > 0, expr("(1000000 * coalesce(_m, 0L)) div _tb")).otherwise(0L))
      out = pr
        .withColumn(s"rouge${n}_f_micro",
          when(col(s"rouge${n}_p_micro") + col(s"rouge${n}_r_micro") > 0,
            expr(s"(2 * rouge${n}_p_micro * rouge${n}_r_micro) div " +
              s"(rouge${n}_p_micro + rouge${n}_r_micro)")).otherwise(0L))
        .drop("_m", "_ta", "_tb")
    }
    // joins move their keys to the front — pin the output order: pair ids
    // first, then the metric columns in ns order
    val metricCols = ns.flatMap(n => Seq(s"rouge${n}_p_micro", s"rouge${n}_r_micro", s"rouge${n}_f_micro"))
    out.select(("id_a" +: "id_b" +: metricCols).map(col): _*)
  }

  /** BLEU-2 (Papineni et al. 2002) between candidate `aCol` and
    * reference `bCol` of every pair — [[rougeScores]]' sibling for the
    * generation-eval direction: modified (multiset-clipped) n-gram
    * precisions for n = 1, 2, the brevity penalty
    * `BP = min(1, exp(1 − r/c))` on unigram lengths, and the geometric
    * mean `BLEU = BP · √(p₁·p₂)` — zero (unsmoothed) when either
    * precision is zero. Precisions export as exact integer floor
    * divisions (the ROUGE convention); BP and BLEU are transcendental,
    * so they micro-quantize through `round(1e6·…)` — the q92 LM-score
    * convention, identical IEEE-double arithmetic in both engines.
    * Output: `id_a`, `id_b`, `bleu1_p_micro`, `bleu2_p_micro`,
    * `bp_micro`, `bleu2_micro`.
    *
    * Shape = rougeScores': pair list cached, member docs semi-joined,
    * per-n gram COUNT tables (never gram pair explosions), clipped
    * matches by (doc, gram) equi-joins — cost bounded by the pair list
    * and gram-table sizes, no corpus pair shape anywhere. */
  def bleuScores(docs: DataFrame, idCol: String, textCol: String,
      pairs: DataFrame, aCol: String, bCol: String): DataFrame = {
    val p = graft.CacheScope.track(
      pairs.select(col(aCol).cast("long").as("id_a"), col(bCol).cast("long").as("id_b"))
        .cache())
    val members = p.select(col("id_a").as("_m")).union(p.select(col("id_b"))).distinct()
    val toks = graft.CacheScope.track(
      docs.join(members, col(idCol).cast("long") === col("_m"), "left_semi")
        .select(col(idCol).cast("long").as("_id"),
          graft.functions.TextFunctions.tokens(col(textCol)).as("_toks"))
        .cache())
    var out = p
    for (n <- Seq(1, 2)) {
      val counts = graft.CacheScope.track(
        toks.select(col("_id"), explode(ngramArr(col("_toks"), n)).as("_g"))
          .groupBy("_id", "_g").agg(count(lit(1)).as("_c"))
          .cache())
      val totals = counts.groupBy("_id").agg(sum(col("_c")).as("_t"))
      val matches = p
        .join(counts.select(col("_id").as("id_a"), col("_g"), col("_c").as("_ca")), Seq("id_a"))
        .join(counts.select(col("_id").as("id_b"), col("_g"), col("_c").as("_cb")),
          Seq("id_b", "_g"))
        .groupBy("id_a", "id_b")
        .agg(sum(least(col("_ca"), col("_cb"))).as(s"_m$n"))
      out = out
        .join(matches, Seq("id_a", "id_b"), "left")
        .join(totals.select(col("_id").as("id_a"), col("_t").as(s"_ta$n")), Seq("id_a"), "left")
        .join(totals.select(col("_id").as("id_b"), col("_t").as(s"_tb$n")), Seq("id_b"), "left")
    }
    val m1 = coalesce(col("_m1"), lit(0L))
    val m2 = coalesce(col("_m2"), lit(0L))
    val ta1 = coalesce(col("_ta1"), lit(0L))
    val ta2 = coalesce(col("_ta2"), lit(0L))
    val tb1 = coalesce(col("_tb1"), lit(0L))
    val bp = when(ta1 >= tb1, lit(1.0))
      .otherwise(exp(lit(1.0) - tb1.cast("double") / ta1.cast("double")))
    out.select(col("id_a"), col("id_b"),
        when(ta1 > 0, expr("(1000000 * coalesce(_m1, 0L)) div coalesce(_ta1, 0L)"))
          .otherwise(0L).as("bleu1_p_micro"),
        when(ta2 > 0, expr("(1000000 * coalesce(_m2, 0L)) div coalesce(_ta2, 0L)"))
          .otherwise(0L).as("bleu2_p_micro"),
        round(lit(1e6) * bp).cast("long").as("bp_micro"),
        when(m1 > 0 && m2 > 0 && ta1 > 0 && ta2 > 0,
          round(lit(1e6) * bp * sqrt(
            (m1.cast("double") / ta1.cast("double")) *
              (m2.cast("double") / ta2.cast("double")))).cast("long"))
          .otherwise(0L).as("bleu2_micro"))
  }

  /** Character n-gram array of a (whitespace-stripped) string — the
    * chrF gram unit. Dynamic positions via `Column.substr`, so the
    * whole extraction stays one codegen'd projection. */
  private def charGramArr(s: Column, n: Int): Column =
    when(length(s) >= n,
      transform(sequence(lit(1), length(s) - (n - 1)), i => s.substr(i, lit(n))))
      .otherwise(array().cast("array<string>"))

  /** chrF (Popović 2015, "chrF: character n-gram F-score for automatic
    * MT evaluation") between candidate `aCol` and reference `bCol` of
    * every pair — the tokenization-free sibling of [[bleuScores]] /
    * [[rougeScores]]: character n-grams (whitespace removed first, the
    * paper's convention) for n = 1..`maxN`, per-order clipped precision
    * `P_n = m_n / ta_n` and recall `R_n = m_n / tb_n` (0 when the
    * denominator is 0), arithmetic means `P = ΣP_n / maxN`,
    * `R = ΣR_n / maxN` over ALL orders, and
    * `chrF_β = (1+β²)·P·R / (β²·P + R)` with β = `betaPct`/100 (the
    * paper's β = 2 weights recall twice) — 0 when the denominator is 0.
    * The means and F are transcendental-free but rational, so they ride
    * IEEE doubles in a FIXED operation order and micro-quantize through
    * `round(1e6·…)` (the [[bleuScores]] convention — the oracle replays
    * the identical expression tree). Output: `id_a`, `id_b`,
    * `chrf_p_micro`, `chrf_r_micro`, `chrf_micro`.
    *
    * Shape = [[rougeScores]]': pair list cached, member docs
    * semi-joined, per-n gram COUNT tables (character-gram cardinality is
    * bounded by alphabet^n, far below token-gram vocabularies), clipped
    * matches by (doc, gram) equi-joins — never a pair-cross shape. */
  def chrfScores(docs: DataFrame, idCol: String, textCol: String,
      pairs: DataFrame, aCol: String, bCol: String,
      maxN: Int = 3, betaPct: Int = 200): DataFrame = {
    require(maxN >= 1 && maxN <= 8, "maxN in [1,8]")
    require(betaPct >= 0, "betaPct >= 0")
    val p = graft.CacheScope.track(
      pairs.select(col(aCol).cast("long").as("id_a"), col(bCol).cast("long").as("id_b"))
        .cache())
    val members = p.select(col("id_a").as("_m")).union(p.select(col("id_b"))).distinct()
    val chars = graft.CacheScope.track(
      docs.join(members, col(idCol).cast("long") === col("_m"), "left_semi")
        .select(col(idCol).cast("long").as("_id"),
          regexp_replace(col(textCol), "\\s+", "").as("_chars"))
        .cache())
    var out = p
    for (n <- 1 to maxN) {
      val counts = graft.CacheScope.track(
        chars.select(col("_id"), explode(charGramArr(col("_chars"), n)).as("_g"))
          .groupBy("_id", "_g").agg(count(lit(1)).as("_c"))
          .cache())
      val totals = counts.groupBy("_id").agg(sum(col("_c")).as("_t"))
      val matches = p
        .join(counts.select(col("_id").as("id_a"), col("_g"), col("_c").as("_ca")), Seq("id_a"))
        .join(counts.select(col("_id").as("id_b"), col("_g"), col("_c").as("_cb")),
          Seq("id_b", "_g"))
        .groupBy("id_a", "id_b")
        .agg(sum(least(col("_ca"), col("_cb"))).as(s"_m$n"))
      out = out
        .join(matches, Seq("id_a", "id_b"), "left")
        .join(totals.select(col("_id").as("id_a"), col("_t").as(s"_ta$n")), Seq("id_a"), "left")
        .join(totals.select(col("_id").as("id_b"), col("_t").as(s"_tb$n")), Seq("id_b"), "left")
    }
    // fixed-order double arithmetic, mirrored term-for-term by the oracle
    def frac(m: Column, t: Column): Column =
      when(coalesce(t, lit(0L)) > 0,
        coalesce(m, lit(0L)).cast("double") / t.cast("double")).otherwise(lit(0.0))
    val pAvg = (1 to maxN).map(n => frac(col(s"_m$n"), col(s"_ta$n")))
      .reduce(_ + _) / lit(maxN.toDouble)
    val rAvg = (1 to maxN).map(n => frac(col(s"_m$n"), col(s"_tb$n")))
      .reduce(_ + _) / lit(maxN.toDouble)
    val b2 = lit(betaPct.toDouble / 100.0 * (betaPct.toDouble / 100.0))
    val f = when(b2 * pAvg + rAvg > 0,
      (lit(1.0) + b2) * pAvg * rAvg / (b2 * pAvg + rAvg)).otherwise(lit(0.0))
    out.select(col("id_a"), col("id_b"),
      round(lit(1e6) * pAvg).cast("long").as("chrf_p_micro"),
      round(lit(1e6) * rAvg).cast("long").as("chrf_r_micro"),
      round(lit(1e6) * f).cast("long").as("chrf_micro"))
  }

  /** Token-level F1 + exact match between candidate `aCol` and
    * reference `bCol` of every pair — the SQuAD answer-scoring pair
    * (Rajpurkar et al. 2016): unigram multiset overlap
    * `m = Σ min(count_a, count_b)`, precision `m/ta`, recall `m/tb`,
    * `F1 = 2m/(ta+tb)`, and `exact` = the whitespace-normalized token
    * sequences are identical. Every metric is an EXACT integer floor
    * division (micro-units) — no doubles anywhere, so the oracle match
    * is arithmetic identity, not IEEE replay. Output: `id_a`, `id_b`,
    * `f1_p_micro`, `f1_r_micro`, `f1_micro`, `exact`.
    *
    * Shape = [[rougeScores]]' n = 1 arm plus one extra pair-list-sized
    * join per side for the normalized-sequence equality — cost bounded
    * by the pair list and the unigram table, never a pair-cross. */
  def tokenF1Scores(docs: DataFrame, idCol: String, textCol: String,
      pairs: DataFrame, aCol: String, bCol: String): DataFrame = {
    val p = graft.CacheScope.track(
      pairs.select(col(aCol).cast("long").as("id_a"), col(bCol).cast("long").as("id_b"))
        .cache())
    val members = p.select(col("id_a").as("_m")).union(p.select(col("id_b"))).distinct()
    val toks = graft.CacheScope.track(
      docs.join(members, col(idCol).cast("long") === col("_m"), "left_semi")
        .select(col(idCol).cast("long").as("_id"),
          TextFunctions.tokens(col(textCol)).as("_toks"))
        .cache())
    val counts = graft.CacheScope.track(
      toks.select(col("_id"), explode(col("_toks")).as("_g"))
        .groupBy("_id", "_g").agg(count(lit(1)).as("_c"))
        .cache())
    val totals = counts.groupBy("_id").agg(sum(col("_c")).as("_t"))
    val matches = p
      .join(counts.select(col("_id").as("id_a"), col("_g"), col("_c").as("_ca")), Seq("id_a"))
      .join(counts.select(col("_id").as("id_b"), col("_g"), col("_c").as("_cb")),
        Seq("id_b", "_g"))
      .groupBy("id_a", "id_b").agg(sum(least(col("_ca"), col("_cb"))).as("_m"))
    val norm = toks.select(col("_id"), array_join(col("_toks"), " ").as("_s"))
    val j = p
      .join(matches, Seq("id_a", "id_b"), "left")
      .join(totals.select(col("_id").as("id_a"), col("_t").as("_ta")), Seq("id_a"), "left")
      .join(totals.select(col("_id").as("id_b"), col("_t").as("_tb")), Seq("id_b"), "left")
      .join(norm.select(col("_id").as("id_a"), col("_s").as("_sa")), Seq("id_a"))
      .join(norm.select(col("_id").as("id_b"), col("_s").as("_sb")), Seq("id_b"))
    val ta = coalesce(col("_ta"), lit(0L))
    val tb = coalesce(col("_tb"), lit(0L))
    j.select(col("id_a"), col("id_b"),
      when(ta > 0, expr("(1000000 * coalesce(_m, 0L)) div _ta")).otherwise(0L)
        .as("f1_p_micro"),
      when(tb > 0, expr("(1000000 * coalesce(_m, 0L)) div _tb")).otherwise(0L)
        .as("f1_r_micro"),
      when(ta + tb > 0,
        expr("(2000000 * coalesce(_m, 0L)) div (coalesce(_ta, 0L) + coalesce(_tb, 0L))"))
        .otherwise(0L).as("f1_micro"),
      (col("_sa") === col("_sb")).cast("int").as("exact"))
  }
}
