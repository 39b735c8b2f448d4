package graft.queries

import graft.Tables
import graft.functions.{Portable, TextFunctions}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Text-analysis query pack over `documents` — the LLM-training-pipeline
  * text surface: language-ID, quality scoring, token counting, document
  * fingerprinting, plus tokenize/explode (SURVEY.md §2C C15 tail +
  * BASELINE.json north star).
  */
object TextQueries {

  // Explode tokens → corpus term frequencies, top 20 (C15 explode + C11 top-k).
  def q30Explode(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(explode(TextFunctions.tokens(col("text"))).as("token"))
      .filter(length(col("token")) > 3)
      .groupBy("token")
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token"))
      .limit(20)

  // Language identification by marker-word evidence.
  def q31LangId(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), col("lang"),
        TextFunctions.langId(col("text")).as("lang_pred"))
      .withColumn("agree", (col("lang") === col("lang_pred")).cast("int"))

  // Quality scoring: exact ratio features + composite score.
  def q32Quality(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(
        col("doc_id"),
        TextFunctions.tokenCount(col("text")).as("n_tokens"),
        length(col("text")).as("len_chars"),
        TextFunctions.stopwordCount(col("text")).as("n_stop"),
        TextFunctions.punctCount(col("text")).as("n_punct"),
        TextFunctions.qualityScore(col("text")).as("quality"))

  // Token counting: whitespace and BPE-ish subword counts per language.
  def q33TokenCount(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(TextFunctions.tokenCount(col("text"))).as("ws_tokens"),
        sum(TextFunctions.subwordCount(col("text"))).as("subword_tokens"))

  // Rolling-hash document fingerprint.
  def q34Fingerprint(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), TextFunctions.fingerprint(col("text")).as("fp"))

  // Deterministic train/valid/test split (80/10/10 by text-content md5
  // bucket): the split assignment a training pipeline must reproduce
  // run-over-run; per-(lang, split) counts are the gate surface.
  def q58HashSplit(s: SparkSession, d: String): DataFrame =
    graft.operators.Relational.hashSplit(Tables.documents(s, d), "text",
        Seq("train" -> 80, "valid" -> 90, "test" -> 100))
      .groupBy("lang", "split")
      .agg(count(lit(1)).as("n"))

  // Training-shard export manifest: content-addressed shard = md5(doc_id)
  // mod 8, per-shard row count / payload bytes / order-independent
  // content sum / key range — the frame a loader checks before consuming
  // an export. One keyed aggregation, all-integer export.
  def q110ShardManifest(s: SparkSession, d: String): DataFrame =
    graft.operators.Relational.shardManifest(
      Tables.documents(s, d), "doc_id", "n_chars", nShards = 8)

  // HTML-to-text extraction: the synthetic corpus is plain text, so both
  // engines wrap every doc in the SAME deterministic HTML shell — script
  // with embedded '<', UPPERCASE style, comment, entities incl. the
  // double-escape '&amp;' — (q64 convention: prove the operator on data
  // that has the phenomenon), then the engine strips it back out.
  private def htmlAugment(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), concat(
      lit("<html><head><title>Doc "), col("doc_id"),
      lit("</title><STYLE type=\"text/css\">p { color: #fff; }</STYLE>"),
      lit("<script>var id = "), col("doc_id"),
      lit("; if (id < 2) { alert(\"x\"); }</script></head><body><!-- c "),
      col("doc_id"),
      lit(" --><h1>Title &amp; "), pmod(col("doc_id"), lit(5)),
      lit("</h1><p>"), col("text"),
      lit("</p><P>A &lt;tag&gt; &quot;q&quot;&nbsp;&#39;end&#39;</P></body></html>")
    ).as("text"))

  def q121HtmlExtract(s: SparkSession, d: String): DataFrame =
    graft.operators.TextOps.htmlToText(htmlAugment(Tables.documents(s, d)), "text")
      .select(col("doc_id"), col("plain_text"),
        length(col("plain_text")).as("n_chars"))

  // Sentence segmentation: the synthetic corpus has no punctuation, so
  // both engines inject the same deterministic terminators (q64
  // convention): a doc-numbered header sentence ending in '!', a period
  // appended to every 'batch' token (sentence count then varies per
  // doc), and an un-terminated tail fragment. The augmentation is shared
  // with q124 and the streaming twin q125 (the piiAugment pattern).
  private[queries] def sentenceAugment(docs: DataFrame,
      textCol: String = "text"): DataFrame =
    docs.select(col("doc_id"),
      concat(lit("Doc "), pmod(col("doc_id"), lit(9)), lit("! "),
        regexp_replace(col(textCol), "batch", "batch."),
        lit(" tail end")).as("text"))

  def q122SentenceSplit(s: SparkSession, d: String): DataFrame =
    graft.operators.TextOps.splitSentences(
      sentenceAugment(Tables.documents(s, d)), "doc_id", "text")

  // Sentence-boundary-respecting chunking over the q122 corpus: 64-token
  // greedy whole-sentence chunks — chunk text, sentence and token counts
  // all hash-checked.
  def q124SentenceChunks(s: SparkSession, d: String): DataFrame =
    graft.operators.TextOps.sentenceChunks(
      sentenceAugment(Tables.documents(s, d)), "doc_id", "text", budget = 64L)

  // Curation v5 — the extraction-era composition, every stage an engine
  // operator: (1) htmlToText strips the deterministic q121 HTML shell;
  // (2) q122's terminators are injected into the EXTRACTED text;
  // (3) dedupSentences drops every cross/within-doc repeated sentence
  // (the 'Doc N!' headers collapse to 9 owners, 'tail end' to one);
  // (4) survivors chunk into 64-token whole-sentence windows;
  // (5) every chunk gets its 2-epoch × 8-shard read address. One plan,
  // every (epoch, shard, pos, doc, chunk, tokens) row hash-checked.
  def q127CurationV5(s: SparkSession, d: String): DataFrame = {
    val plain = graft.operators.TextOps.htmlToText(
      htmlAugment(Tables.documents(s, d)), "text")
    val sentReady = sentenceAugment(plain, textCol = "plain_text")
    val deduped = graft.operators.TextOps
      .dedupSentences(sentReady, "doc_id", "text")
      .filter(col("n_kept") > 0)
      .select(col("doc_id"), col("clean_text").as("text"))
    val chunks = graft.operators.TextOps
      .sentenceChunks(deduped, "doc_id", "text", budget = 64L)
      .select(col("doc_id"), col("chunk_id"), col("n_tokens"),
        concat(col("doc_id"), lit("#"), col("chunk_id")).as("chunk_key"))
    graft.operators.Relational.epochShuffle(chunks, "chunk_key",
        epochs = 2, nShards = 8)
      .select(col("epoch"), col("shard_id"), col("pos"),
        col("doc_id"), col("chunk_id"), col("n_tokens"))
  }

  // Sentence-grain exact dedup over the q122 corpus: the 'Doc N!' headers
  // repeat across every doc sharing doc_id%9, the 'batch.'-terminated
  // runs repeat wherever the random text repeats, and the 'tail end'
  // fragment survives only in the first doc — every reassembled
  // clean_text and count is hash-checked.
  def q126SentenceDedup(s: SparkSession, d: String): DataFrame =
    graft.operators.TextOps.dedupSentences(
      sentenceAugment(Tables.documents(s, d)), "doc_id", "text")

  // Deterministic per-epoch shuffle: every (epoch, row) gets a content-
  // addressed (shard, pos) read address — the reproducible epoch
  // permutation a training loader replays; every address hash-checked.
  def q123EpochShuffle(s: SparkSession, d: String): DataFrame =
    graft.operators.Relational.epochShuffle(
      Tables.documents(s, d).select("doc_id"), "doc_id", epochs = 2, nShards = 4)
      .select(col("epoch"), col("shard_id"), col("pos"), col("doc_id"))

  // Per-source distribution drift from the corpus mixture: smoothed KL +
  // total variation over 4096 hashed-unigram buckets, nano-quantized
  // integer export (order-independent sums -> engine-exact replay).
  def q112SourceDrift(s: SparkSession, d: String): DataFrame =
    graft.operators.TextOps.unigramDrift(
      Tables.documents(s, d), "source", "text", buckets = 4096, alpha = 1.0)

  // Incremental winnow vs a fingerprint store: the %10 increment swept
  // against history that exists ONLY as winnowed (id, fingerprint) rows
  // — history text never rescanned (the q90/q106 discipline at the
  // winnowed density).
  def q119WinnowIncremental(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val store = graft.operators.TextOps.winnowFingerprints(
      docs.filter(col("doc_id") % 10 =!= 0), "doc_id", "text", k = 3, w = 4)
    graft.operators.TextOps.winnowIncremental(
      docs.filter(col("doc_id") % 10 === 0), "doc_id", "text",
      store, "doc_id", "fingerprint", k = 3, w = 4, minShared = 2)
  }

  // Curation v4 — the second continuation's operators composed end to
  // end, every stage an engine operator: (1) NB classifier trained on
  // the 80% content split verifies the recorded language label over the
  // WHOLE corpus (frozen-model inference; docs whose predicted label
  // disagrees are dropped — the label-verification filter); (2) winnowing
  // dedup drops the later doc of every >= 2-shared-fingerprint overlap
  // pair (greedy keep-first, deterministic); (3) the survivors ship as a
  // content-addressed 8-shard export manifest — the frame a training
  // loader certifies before consuming.
  def q118CurationV4(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val sp = graft.operators.Relational.hashSplit(docs, "text",
      Seq("train" -> 80, "rest" -> 100))
    val model = graft.operators.TextOps.nbTrain(
      sp.filter(col("split") === "train"), "text", "lang")
    val pred = graft.operators.TextOps.nbScoreWith(docs, "doc_id", "text", model)
      .select(col("doc_id"), col("label_pred"))
    val kept = docs.join(pred, Seq("doc_id"))
      .filter(col("label_pred") === col("lang")).drop("label_pred")
    val dupTails = graft.operators.TextOps.winnowOverlapPairs(
        kept, "doc_id", "text", k = 3, w = 4, minShared = 2)
      .select(col("id_b").as("doc_id")).distinct()
    val survivors = kept.join(dupTails, Seq("doc_id"), "left_anti")
    graft.operators.Relational.shardManifest(survivors, "doc_id", "n_chars", nShards = 8)
  }

  // Winnowing (MOSS) partial-overlap sweep: doc pairs sharing >= 2
  // winnowed fingerprints (trigram hashes, window 4) — catches lifted
  // passages whole-doc Jaccard misses.
  def q117WinnowPairs(s: SparkSession, d: String): DataFrame =
    graft.operators.TextOps.winnowOverlapPairs(
      Tables.documents(s, d), "doc_id", "text", k = 3, w = 4, minShared = 2)

  // Naive Bayes classifier trained on the content-hash train split
  // (label = lang), scoring the held-out 20% — trained-model inference
  // with micro-quantized log-posteriors and margins.
  def q113NbClassify(s: SparkSession, d: String): DataFrame = {
    val sp = graft.operators.Relational.hashSplit(
      Tables.documents(s, d), "text", Seq("train" -> 80, "rest" -> 100))
    graft.operators.TextOps.nbTrainScore(
      sp.filter(col("split") === "train"), sp.filter(col("split") =!= "train"),
      "doc_id", "text", "lang", alpha = 1.0)
  }

  // Deterministic weighted training mix (en ×2.5, de ×1, fr ×0.25, zh/es
  // dropped): every emitted (doc, copy) row hash-checked — the mixture a
  // training run must reproduce engine-over-engine.
  def q70WeightedMixture(s: SparkSession, d: String): DataFrame =
    graft.operators.Relational.weightedMixture(
        Tables.documents(s, d).select("doc_id", "lang"), "lang", "doc_id",
        Seq("en" -> 2.5, "de" -> 1.0, "fr" -> 0.25))
      .select("doc_id", "lang", "copy_idx")

  // Token-window chunking (40-token windows, 10-token overlap): the
  // context-length packing input; every (doc, chunk) row hash-checked.
  def q59ChunkTokens(s: SparkSession, d: String): DataFrame =
    graft.operators.TextOps.chunkTokens(Tables.documents(s, d), "doc_id", "text",
      window = 40, overlap = 10)

  // Deterministic PII injection shared by the batch (q64) and streaming
  // (q78) redaction gates: the corpus is synthetic and PII-free, so both
  // engines append the same generated email + phone per doc.
  private[queries] def piiAugment(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      concat(col("text"), lit(" contact user"), col("doc_id"),
        lit("@mail.example.org or 555-"),
        lpad(pmod(col("doc_id"), lit(1000)).cast("string"), 3, "0"), lit("-"),
        lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0")).as("text"))

  // PII redaction over deterministically injected addresses/numbers —
  // proving the regex surface on text that actually contains PII.
  def q64PiiRedact(s: SparkSession, d: String): DataFrame =
    graft.operators.TextOps.redactPii(
      piiAugment(Tables.documents(s, d)), "doc_id", "text")

  // Sequence packing: contiguous-greedy 1024-token packs over doc_id
  // order via a DISTRIBUTED two-phase prefix sum (never a global-order
  // window = single partition); replayed by a DuckDB window cumsum.
  def q65SeqPack(s: SparkSession, d: String): DataFrame = {
    val weighted = Tables.documents(s, d)
      .select(col("doc_id"),
        graft.functions.TextFunctions.tokenCount(col("text")).as("n_tokens"))
    graft.operators.TextOps.sequentialPack(weighted, "doc_id", "n_tokens", budget = 1024L)
  }

  // Gopher-style bigram repetition stats — the repetition quality filter;
  // every per-doc count and fraction hash-checked.
  def q71RepetitionStats(s: SparkSession, d: String): DataFrame =
    graft.operators.TextOps.repetitionStats(Tables.documents(s, d), "doc_id", "text", n = 2)

  // BM25 keyword search: top-10 docs for a 4-term query; quantized
  // per-term contributions make the score order-free and replayable.
  def q72Bm25(s: SparkSession, d: String): DataFrame =
    graft.operators.TextOps.bm25Search(Tables.documents(s, d), "doc_id", "text",
      query = Seq("spark", "hash", "merge", "window"), k = 10)

  // The synthetic corpus is random text (no natural boilerplate), so both
  // engines append the same 9-token boilerplate tail to every third doc —
  // the q64 convention: prove the operator on data that actually has the
  // phenomenon. 5-token spans, common = present in >= 10 docs.
  private val Boiler = " follow us for updates and subscribe to the newsletter"
  private[graft] def withBoiler(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(col("doc_id"),
      when(pmod(col("doc_id"), lit(3)) === 0, concat(col("text"), lit(Boiler)))
        .otherwise(col("text")).as("text"))

  // Corpus-level repeated spans (boilerplate discovery).
  def q73RepeatedSpans(s: SparkSession, d: String): DataFrame =
    graft.operators.TextOps.repeatedSpans(withBoiler(s, d), "doc_id", "text",
      span = 5, minDocs = 10)

  // Per-doc boilerplate coverage (the drop/keep curation signal).
  def q74BoilerplateCoverage(s: SparkSession, d: String): DataFrame =
    graft.operators.TextOps.boilerplateCoverage(withBoiler(s, d), "doc_id", "text",
      span = 5, minDocs = 10)

  // Inverted index (the artifact behind q72's BM25): df >= 2, postings
  // capped to the first 25 doc ids — both knobs exercised; every
  // (term, df, total_tf, postings-string) row hash-checked.
  def q75InvertedIndex(s: SparkSession, d: String): DataFrame =
    graft.operators.TextOps.invertedIndex(Tables.documents(s, d), "doc_id", "text",
      minDf = 2, maxPostings = 25)

  // Corpus datasheet per (source, lang): totals + exact token percentiles.
  def q76CorpusProfile(s: SparkSession, d: String): DataFrame =
    graft.operators.TextOps.corpusProfile(Tables.documents(s, d),
      Seq("source", "lang"), "text")

  // Curation v2 — the new quartet composed end-to-end: drop docs carrying
  // corpus-common boilerplate spans, drop repetition-dominated docs
  // (top bigram > 34% of the stream, incl. docs too short to judge),
  // split the survivors deterministically, and publish the per-(lang,
  // split) datasheet. Every stage is an engine operator and the whole
  // chain replays as one DuckDB CTE — the proof the operators compose.
  def q77CurationV2(s: SparkSession, d: String): DataFrame = {
    val aug = withBoiler(s, d)
    val cov = graft.operators.TextOps.boilerplateCoverage(aug, "doc_id", "text", 5, 10)
    val rep = graft.operators.TextOps.repetitionStats(aug, "doc_id", "text", 2)
    val kept = aug
      .join(cov.filter(col("n_common") === 0).select("doc_id"), Seq("doc_id"))
      .join(rep.filter(col("top_frac") <= 0.34).select("doc_id"), Seq("doc_id"))
    val split = graft.operators.Relational.hashSplit(kept, "text",
      Seq("train" -> 80, "valid" -> 90, "test" -> 100))
    split.join(Tables.documents(s, d).select("doc_id", "lang"), Seq("doc_id"))
      .groupBy("lang", "split")
      .agg(count(lit(1)).as("n_docs"),
        sum(TextFunctions.tokenCount(col("text")).cast("long")).as("tokens"))
  }

  // Deterministic per-language quota sample: exactly min(20, |stratum|)
  // docs per lang by content-hash order — the fixed-budget stratum
  // sampler of a training mix, reproducible engine-over-engine
  // (composition: top_k_per_group under an md5 total order).
  def q80QuotaSample(s: SparkSession, d: String): DataFrame =
    graft.operators.Relational.topKPerGroup(
        Tables.documents(s, d).select(col("doc_id"), col("lang")),
        Seq(col("lang")),
        Seq(Portable.md5Long60(col("doc_id").cast("string")).asc, col("doc_id").asc),
        k = 20)
      .select("lang", "doc_id")

  // The bounded-state sibling of q80: same per-lang quota sample (same
  // md5 content-hash order, same oracle VERBATIM) computed as a typed
  // top-k aggregation with map-side combine instead of a window sort —
  // the hot-stratum shape where one stratum holds a billion docs.
  def q84QuotaSampleAgg(s: SparkSession, d: String): DataFrame =
    graft.operators.Relational.quotaSampleByHash(
      Tables.documents(s, d).select(col("lang"), col("doc_id")),
      "lang", "doc_id", k = 20)

  // Text normalization (the canonical pre-dedup stage), exercised on
  // injected mixed-case/punctuation/extra-whitespace (q64 convention —
  // the synthetic corpus is already clean).
  def q81Normalize(s: SparkSession, d: String): DataFrame = {
    val aug = Tables.documents(s, d).select(col("doc_id"),
      concat(col("text"), lit(" THE QUICK!! Brown-Fox;  jumps 42 ")).as("text"))
    graft.operators.TextOps.normalizeText(aug, "text")
      .select(col("doc_id"), col("norm_text"),
        TextFunctions.tokenCount(col("norm_text")).as("n_tokens"))
  }

  // Unicode (NFC) normalization — the multilingual mode, exercised on
  // injected non-ASCII that NFC actually has to work on: precomposed
  // CAFÉ/Straße next to DECOMPOSED Nai+◌̈ve and E+◌́le+◌̀ve (combining
  // marks), plus an em dash that must strip to a space. Both engines
  // compose (NFC), lowercase, strip non-letter/digit, collapse
  // whitespace; the tail uses \u escapes so the decomposed forms can
  // never be silently re-composed by a source-encoding pass.
  private val UniTail =
    " CAF\u00c9 Nai\u0308ve  Stra\u00dfe; E\u0301le\u0300ve \u2014 42 "
  def q83NormalizeUnicode(s: SparkSession, d: String): DataFrame = {
    val aug = Tables.documents(s, d).select(col("doc_id"),
      concat(col("text"), lit(UniTail)).as("text"))
    graft.operators.TextOps.normalizeText(aug, "text", unicode = true)
      .select(col("doc_id"), col("norm_text"),
        TextFunctions.tokenCount(col("norm_text")).as("n_tokens"))
  }

  // BM25 batch-scoring arm (the broadcast-terms-table shape for
  // 10k-term keyword sweeps) on the SAME 4-term query as q72 — both
  // arms must produce identical scores, so q72's oracle replays this
  // gate verbatim.
  def q85Bm25Batch(s: SparkSession, d: String): DataFrame = {
    val terms = s.createDataFrame(
      Seq("spark", "hash", "merge", "window").map(Tuple1(_))).toDF("term")
    graft.operators.TextOps.bm25ScoreBatch(Tables.documents(s, d), "doc_id", "text",
      terms, "term", k = 10)
  }

  // Domain-blocklist filtering — the synthetic corpus has no URLs, so
  // both engines inject the same deterministic mix (q64 convention):
  // every doc links one rotating site, every even doc adds a link under
  // a blocked apex domain; site3.example.com is itself blocklisted, so
  // docs with doc_id % 7 == 3 are caught by the exact-host arm too.
  private val BlockedDomains = Seq("bad.example.org", "site3.example.com")
  def q86UrlBlocklist(s: SparkSession, d: String): DataFrame = {
    val aug = Tables.documents(s, d).select(col("doc_id"),
      concat(col("text"),
        lit(" see https://site"), pmod(col("doc_id"), lit(7)),
        lit(".example.com/p/"), col("doc_id"),
        // every even doc links a blocked apex — UPPERCASED every 4th doc
        // (DNS is case-insensitive; the filter must still catch it)
        when(pmod(col("doc_id"), lit(4)) === 0,
          concat(lit(" and HTTP://BLOCKED"), pmod(col("doc_id"), lit(3)),
            lit(".BAD.EXAMPLE.ORG/x")))
          .when(pmod(col("doc_id"), lit(2)) === 0,
            concat(lit(" and http://blocked"), pmod(col("doc_id"), lit(3)),
              lit(".bad.example.org/x"))).otherwise(lit("")),
        // every 5th doc adds a userinfo-spoofed URL: the host after '@'
        // is blocked and must be the one matched
        when(pmod(col("doc_id"), lit(5)) === 0,
          concat(lit(" plus https://innocent.com@deep"), pmod(col("doc_id"), lit(3)),
            lit(".bad.example.org/y"))).otherwise(lit(""))).as("text"))
    graft.operators.TextOps.urlBlocklistFilter(aug, "doc_id", "text", BlockedDomains)
  }

  // Paragraph-grain exact dedup — the corpus has single-paragraph docs,
  // so both engines append the same two SHARED sentences per doc (5 and
  // 7 rotating variants): each shared variant survives only in the first
  // doc carrying it; every later doc keeps its unique head paragraph and
  // loses the repeats. Every reassembled clean_text is hash-checked.
  def q88ParagraphDedup(s: SparkSession, d: String): DataFrame = {
    val aug = Tables.documents(s, d).select(col("doc_id"),
      concat(col("text"),
        lit(". shared sentence alpha variant "), pmod(col("doc_id"), lit(5)),
        lit(". shared sentence beta variant "), pmod(col("doc_id"), lit(7))).as("text"))
    graft.operators.TextOps.dedupParagraphs(aug, "doc_id", "text")
  }

  // Bigram-LM perplexity scoring (CCNet-style quality filter): add-α
  // self-trained model, per-token quantized NLL, integer keep budget at
  // 3.4 nats/token ≈ the corpus median (measured 3.40M micro-nats at
  // both sf0.001 and sf0.01) so both keep classes stay populated.
  def q92LmScore(s: SparkSession, d: String): DataFrame =
    graft.operators.TextOps.ngramLmScore(Tables.documents(s, d), "doc_id", "text",
      alpha = 0.1, keepMaxMicroPerToken = 3400000L)

  // DSIR importance selection (Xie et al. 2023): target domain = the
  // src13 stratum, raw pool = the whole corpus; hashed-bigram LLR under
  // add-1 smoothing over 4096 buckets; deterministic top-50 (the paper's
  // Gumbel resample made replayable).
  def q101DsirSelect(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    graft.operators.TextOps.dsirScore(docs,
      docs.filter(col("source") === "src13"), "doc_id", "text",
      buckets = 4096, lambda = 1.0, k = 50)
  }

  // The paper-faithful DSIR arm: Gumbel top-k resampling at temperature
  // 2.0 — k docs without replacement ∝ exp(score/τ), the seeded draw
  // riding a salted md5 so DuckDB replays the SAMPLE, not just the
  // scores. Same model as q101; different (stochastic) selection.
  def q105DsirResample(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    graft.operators.TextOps.dsirScore(docs,
      docs.filter(col("source") === "src13"), "doc_id", "text",
      buckets = 4096, lambda = 1.0, k = 50, gumbelTemp = 2.0)
  }

  // Per-doc TF-IDF keywords: top-5 terms per document, smoothed idf,
  // micro-quantized, term tie-break.
  def q102TfidfKeywords(s: SparkSession, d: String): DataFrame =
    graft.operators.TextOps.tfidfKeywords(Tables.documents(s, d),
      "doc_id", "text", k = 5)

  // Exact stratified split: per-lang 90/5/5 via largest-remainder ppm
  // apportionment in md5 rank order — counts exact per stratum, unlike
  // q58's Bernoulli hash split.
  def q103StratifiedSplit(s: SparkSession, d: String): DataFrame =
    graft.operators.Relational.stratifiedSplit(Tables.documents(s, d),
      "lang", "doc_id",
      Seq(("train", 900000L), ("val", 50000L), ("test", 50000L)))

  // BPE tokenizer: train 20 merges on the corpus, then per-doc subword
  // budget accounting. Deterministic end to end (count-desc/lex tie-break)
  // but not SQL-replayable (iterative merges) → rows-only gate; the
  // exactness oracle is BpeSpec's independent reference implementation.
  def q94Bpe(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val merges = graft.operators.Bpe.bpeTrain(docs, "text", numMerges = 20)
    graft.operators.Bpe.bpeEncode(docs, "doc_id", "text", merges)
  }

  // BPE audit (round-8 driver-green companion to q94): subword
  // concatenation must reproduce every vocabulary word exactly — merges
  // only regroup symbols, so ANY drop/duplication/reorder bug in
  // applyMerge/encodeWord corrupts `decoded` and the hash goes red. The
  // vocabulary itself is exact SQL (the q30 tokenization), so the whole
  // word-grain output is oracle-checkable even though the learned merge
  // table is not.
  def q94aBpeRoundtrip(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val merges = graft.operators.Bpe.bpeTrain(docs, "text", numMerges = 20)
    val joined = concat_ws("", col("subwords"))
    graft.operators.Bpe.bpeEncodeWords(docs, "text", merges)
      .select(col("word"),
        // the trailing symbol always carries the 4-char end-of-word
        // marker — strip it to recover the raw word
        joined.substr(lit(1), length(joined) - lit(graft.operators.Bpe.EndMark.length))
          .as("decoded"),
        (col("n_subwords") >= 1 &&
          col("n_subwords") <= length(col("word")) + 1)
          .cast("int").as("n_subwords_ok"))
  }

  // Boilerplate REMOVAL (the actionable q73/q74 sibling): strip every
  // token inside a corpus-common 5-token span, keep the rest — same
  // injected-boilerplate convention as q73.
  def q96StripSpans(s: SparkSession, d: String): DataFrame =
    graft.operators.TextOps.stripRepeatedSpans(withBoiler(s, d), "doc_id", "text",
      span = 5, minDocs = 10)

  // Token-budget mixture: per-lang budgets spanning every regime at the
  // gate SF (en/de/zh partial, fr exhausts its stratum, es unbudgeted →
  // dropped). Keep rule: cum_before < budget under the md5 total order.
  private val LangBudgets =
    Seq("en" -> 6000L, "de" -> 2000L, "fr" -> 10000L, "zh" -> 1500L)
  def q99TokenBudget(s: SparkSession, d: String): DataFrame =
    graft.operators.Relational.tokenBudgetSample(
      Tables.documents(s, d).withColumn("n_tokens", TextFunctions.tokenCount(col("text"))),
      "lang", "doc_id", "n_tokens", LangBudgets)

  // Curation v3 — the continuation operators composed end to end: strip
  // corpus-common boilerplate spans, self-train the bigram LM on the
  // CLEANED corpus and drop high-perplexity docs, draw the per-lang
  // token-budget mix from the survivors, publish the datasheet. Every
  // stage is an engine operator and the whole chain replays as ONE
  // DuckDB CTE — the q77 composition proof for the new family.
  private val V3Budgets =
    Seq("en" -> 3000L, "de" -> 1000L, "fr" -> 5000L, "zh" -> 800L)
  def q100CurationV3(s: SparkSession, d: String): DataFrame = {
    val stripped = graft.operators.TextOps.stripRepeatedSpans(
        withBoiler(s, d), "doc_id", "text", span = 5, minDocs = 10)
      .select(col("doc_id"), col("clean_text").as("text"))
    val scored = graft.operators.TextOps.ngramLmScore(stripped, "doc_id", "text",
      alpha = 0.1, keepMaxMicroPerToken = 3400000L)
    val kept = scored.filter(col("keep"))
      .join(Tables.documents(s, d).select("doc_id", "lang"), Seq("doc_id"))
    graft.operators.Relational.tokenBudgetSample(kept, "lang", "doc_id",
        "n_tokens", V3Budgets)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("tokens"))
  }

  // Fill-in-the-middle transform: content-addressed (md5-derived) cut
  // points split each doc into prefix/middle/suffix, exported PSM-ordered
  // for FIM training. The gate hashes the assembled training string and
  // pins all three segment lengths; docs under 64 chars pass through
  // unsplit (fim_applied = 0).
  def q131Fim(s: SparkSession, d: String): DataFrame =
    fimExport(graft.operators.Relational.fimTransform(
      Tables.documents(s, d).select("doc_id", "text"), "doc_id", "text", minChars = 64))

  /** The q131 gate projection (lengths + assembled-string md5) — shared
    * with the streaming twin (q136) so both gates export identically. */
  private[queries] def fimExport(df: DataFrame): DataFrame =
    df.select(col("doc_id"), col("fim_applied"),
      length(col("prefix")).as("n_pre"), length(col("middle")).as("n_mid"),
      length(col("suffix")).as("n_suf"), md5(col("fim_text")).as("fim_md5"))

  // T5-style span corruption: content-addressed masked spans replaced by
  // numbered sentinels, targets = sentinel-prefixed spans. The gate hashes
  // both assembled sequences and pins mask/span counts per doc.
  // Classifier calibration: the q113 NB predictions bucketed into ten
  // equal-width margin bins against the held-out true labels — the
  // reliability diagram a curation pipeline checks before thresholding
  // on classifier confidence.
  def q152Calibration(s: SparkSession, d: String): DataFrame = {
    val truth = graft.operators.Relational.hashSplit(Tables.documents(s, d),
        "text", Seq("train" -> 80, "rest" -> 100))
      .filter(col("split") =!= "train").select("doc_id", "lang")
    graft.operators.TextOps.calibrationCurve(
      q113NbClassify(s, d), "doc_id", "label_pred", "margin_micro",
      truth, "doc_id", "lang", nBins = 10)
  }

  // Length-bucketed training batches: documents grouped into 16-row
  // batches of similar length (char-count bands) so per-batch padding is
  // bounded by the band width; deterministic hash order within a band.
  def q148LengthBatches(s: SparkSession, d: String): DataFrame =
    graft.operators.TextOps.lengthBucketBatches(
      Tables.documents(s, d).select("doc_id", "n_chars"),
      "doc_id", "n_chars", Seq(200L, 400L, 800L), batchSize = 16)

  def q137SpanCorrupt(s: SparkSession, d: String): DataFrame =
    graft.operators.TextOps.spanCorrupt(
        Tables.documents(s, d).select("doc_id", "text"), "doc_id", "text",
        maskPct = 15, spanLen = 3)
      .select(col("doc_id"), md5(col("corrupted")).as("corr_md5"),
        md5(col("targets")).as("tgt_md5"), col("n_masked"), col("n_spans"))

  // Rebalanced mixture: equalize the four languages' token (char) mass —
  // weights DERIVED from the corpus (share * total / stratumTokens), the
  // multilingual "equalize my languages" draw. Full row-level gate.
  def q138RebalancedMixture(s: SparkSession, d: String): DataFrame =
    graft.operators.Relational.rebalancedMixture(
        Tables.documents(s, d).select("doc_id", "lang", "n_chars"),
        "lang", "doc_id", "n_chars",
        Seq("en" -> 0.25, "de" -> 0.25, "fr" -> 0.25, "zh" -> 0.25))
      .select(col("doc_id"), col("lang"), col("copy_idx"))

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q131_fim" -> q131Fim,
    "q137_span_corrupt" -> q137SpanCorrupt,
    "q148_length_batches" -> q148LengthBatches,
    "q152_calibration" -> q152Calibration,
    "q138_rebalanced_mixture" -> q138RebalancedMixture,
    "q110_shard_manifest" -> q110ShardManifest,
    "q112_source_drift" -> q112SourceDrift,
    "q113_nb_classify" -> q113NbClassify,
    "q117_winnow_pairs" -> q117WinnowPairs,
    "q118_curation_v4" -> q118CurationV4,
    "q119_winnow_incremental" -> q119WinnowIncremental,
    "q100_curation_v3" -> q100CurationV3,
    "q99_token_budget" -> q99TokenBudget,
    "q96_strip_spans" -> q96StripSpans,
    "q101_dsir_select" -> q101DsirSelect,
    "q105_dsir_resample" -> q105DsirResample,
    "q102_tfidf_keywords" -> q102TfidfKeywords,
    "q103_stratified_split" -> q103StratifiedSplit,
    "q94_bpe" -> q94Bpe,
    "q94a_bpe_roundtrip" -> q94aBpeRoundtrip,
    "q92_lm_score" -> q92LmScore,
    "q83_normalize_unicode" -> q83NormalizeUnicode,
    "q121_html_extract" -> q121HtmlExtract,
    "q122_sentence_split" -> q122SentenceSplit,
    "q123_epoch_shuffle" -> q123EpochShuffle,
    "q124_sentence_chunks" -> q124SentenceChunks,
    "q126_sentence_dedup" -> q126SentenceDedup,
    "q127_curation_v5" -> q127CurationV5,
    "q86_url_blocklist" -> q86UrlBlocklist,
    "q88_paragraph_dedup" -> q88ParagraphDedup,
    "q84_quota_sample_agg" -> q84QuotaSampleAgg,
    "q85_bm25_batch" -> q85Bm25Batch,
    "q30_explode_tokens" -> q30Explode,
    "q31_lang_id" -> q31LangId,
    "q32_text_quality" -> q32Quality,
    "q33_token_count" -> q33TokenCount,
    "q34_fingerprint" -> q34Fingerprint,
    "q58_hash_split" -> q58HashSplit,
    "q70_weighted_mixture" -> q70WeightedMixture,
    "q59_chunk_tokens" -> q59ChunkTokens,
    "q64_pii_redact" -> q64PiiRedact,
    "q65_seq_pack" -> q65SeqPack,
    "q71_repetition_stats" -> q71RepetitionStats,
    "q72_bm25_search" -> q72Bm25,
    "q73_repeated_spans" -> q73RepeatedSpans,
    "q74_boilerplate_coverage" -> q74BoilerplateCoverage,
    "q75_inverted_index" -> q75InvertedIndex,
    "q76_corpus_profile" -> q76CorpusProfile,
    "q77_curation_v2" -> q77CurationV2,
    "q80_quota_sample" -> q80QuotaSample,
    "q81_normalize" -> q81Normalize)

  private val markersSql = TextFunctions.LangMarkers.zipWithIndex.map {
    case ((lang, ms), i) => s"('$lang', $i, [${ms.map(m => s"'$m'").mkString(",")}])"
  }.mkString(", ")

  private val stopSql = TextFunctions.Stopwords.map(w => s"'$w'").mkString(",")


  // ---- sentence-family oracle fragments (the bm25CtesSql sharing
  // discipline: each structure exists ONCE; q121/q122/q124/q126/q127
  // interpolate these, so an augmentation or pattern change lands in
  // every gate or in none). Plain vals (no interpolation) so single
  // backslashes survive; composed via s"${...}" whose interpolated
  // segments are NOT escape-processed. ----
  // The q121/q127 deterministic HTML shell around `text`, emitted as t.
  private val htmlShellSql =
    """SELECT doc_id,
             '<html><head><title>Doc ' || doc_id ||
             '</title><STYLE type="text/css">p { color: #fff; }</STYLE>' ||
             '<script>var id = ' || doc_id ||
             '; if (id < 2) { alert("x"); }</script></head><body><!-- c ' ||
             doc_id || ' --><h1>Title &amp; ' || (doc_id % 5) ||
             '</h1><p>' || text ||
             '</p><P>A &lt;tag&gt; &quot;q&quot;&nbsp;&#39;end&#39;</P></body></html>'
             AS t
           FROM documents"""
  // htmlToText replay over a rel exposing t, emitted as plain_text.
  private val htmlExtractSql =
    """trim(regexp_replace(
               replace(replace(replace(replace(replace(replace(
                 regexp_replace(regexp_replace(regexp_replace(regexp_replace(t,
                   '(?is)<script\b[^>]*>.*?</script\s*>', ' ', 'g'),
                   '(?is)<style\b[^>]*>.*?</style\s*>', ' ', 'g'),
                   '(?s)<!--.*?-->', ' ', 'g'),
                   '(?s)<[^>]*>', ' ', 'g'),
                 '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
                 '&#39;', ''''), '&nbsp;', ' '), '&amp;', '&'),
               '\s+', ' ', 'g')) AS plain_text"""
  // q122-convention terminator injection over a named rel/column, as t.
  private[queries] def sentAugSql(src: String, textCol: String): String =
    s"""SELECT doc_id,
             'Doc ' || (doc_id % 9) || '! ' ||
             regexp_replace($textCol, 'batch', 'batch.', 'g') || ' tail end' AS t
           FROM $src"""
  // splitSentences replay over a rel exposing t: s (the kept-sentence
  // list) and x (positional explode). The pattern is interpolated from
  // THE operator's own builder — the engines cannot drift.
  private[queries] def sentSplitCtesSql(src: String): String =
    s"""s AS (
           SELECT doc_id,
             list_filter(list_transform(
               regexp_extract_all(t, '${graft.operators.TextOps.sentencePattern(".!?")}'),
               x -> trim(x)), x -> x <> '') AS l
           FROM $src
         ), x AS (
           SELECT doc_id, CAST(k.k AS INT) AS sent_idx, l[k.k + 1] AS sentence
           FROM s JOIN (SELECT unnest(generate_series(0,
             (SELECT CAST(max(len(l)) AS BIGINT) FROM s))) AS k) k
             ON k.k < len(l)
         )"""

  // Okapi BM25 scoring CTE chain over the fixed 4-term query — ONE
  // fragment shared by the isin-arm gate (q72), the broadcast-terms
  // batch-arm gate (q85), and the lexical arm of the hybrid-retrieval
  // gate (q97, in AnnQueries): all three must score identically by
  // contract, so a quantization or tie-break change lands in every gate
  // or in none (the quotaSampleSql sharing discipline).
  private[queries] val bm25CtesSql =
    """t AS (SELECT doc_id, string_split(trim(text), ' ') AS toks FROM documents),
       dl AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl FROM t),
       st AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(dl) AS BIGINT) AS sumdl FROM dl),
       tf AS (SELECT doc_id, tok AS term, CAST(count(*) AS BIGINT) AS tf
              FROM (SELECT doc_id, unnest(toks) AS tok FROM t)
              WHERE tok IN ('spark', 'hash', 'merge', 'window')
              GROUP BY doc_id, tok),
       df AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
       c AS (
         SELECT tf.doc_id,
           CAST(round(1000000.0 * (
             ln((CAST(st.n - df.df AS DOUBLE) + 0.5) / (CAST(df.df AS DOUBLE) + 0.5) + 1.0)
             * ((CAST(tf.tf AS DOUBLE) * (1.2 + 1.0)) /
                (CAST(tf.tf AS DOUBLE) + 1.2 * (1.0 - 0.75 + 0.75 *
                  (CAST(dl.dl AS DOUBLE) / (CAST(st.sumdl AS DOUBLE) / CAST(st.n AS DOUBLE))))))
           )) AS BIGINT) AS c
         FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN st
       )"""

  private val bm25Sql =
    s"""WITH $bm25CtesSql
       SELECT doc_id, CAST(sum(c) AS BIGINT) AS score_micro,
         CAST(count(*) AS BIGINT) AS n_terms
       FROM c GROUP BY doc_id
       ORDER BY score_micro DESC, doc_id LIMIT 10"""

  // DSIR scoring CTE chain (hashed-bigram LLR per doc) — shared by the
  // deterministic-top-k gate (q101) and the Gumbel-resample gate (q105):
  // one model, two selection rules, drift-proof by construction.
  private val dsirCtesSql =
    """t AS (SELECT doc_id, source, string_split(trim(text), ' ') AS toks
            FROM documents),
       g AS (SELECT doc_id, source,
               ('0x' || substring(md5(toks[k.k] || ' ' || toks[k.k + 1]), 1, 15))::BIGINT
                 % 4096 AS b
             FROM t JOIN (SELECT unnest(generate_series(1,
               (SELECT CAST(max(len(toks)) AS BIGINT) FROM t))) AS k) k
               ON k.k < len(toks)),
       tc AS (SELECT b, CAST(count(*) AS BIGINT) AS ct FROM g
              WHERE source = 'src13' GROUP BY b),
       rc AS (SELECT b, CAST(count(*) AS BIGINT) AS cr FROM g GROUP BY b),
       st AS (SELECT (SELECT CAST(sum(cr) AS BIGINT) FROM rc) AS tr,
                     (SELECT COALESCE(CAST(sum(ct) AS BIGINT), 0) FROM tc) AS tt),
       llr AS (SELECT rc.b,
                 CAST(round(1000000.0 * (
                   ln((COALESCE(tc.ct, 0) + 1.0) / (st.tt + 1.0 * 4096)) -
                   ln((rc.cr + 1.0) / (st.tr + 1.0 * 4096)))) AS BIGINT) AS lm
               FROM rc LEFT JOIN tc USING (b) CROSS JOIN st),
       sc AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams,
                     CAST(sum(lm) AS BIGINT) AS score_micro
              FROM g JOIN llr USING (b) GROUP BY doc_id)"""

  // Shared by the window-sort gate (q80) and the bounded-agg gate (q84):
  // both paths must select the identical sample by contract.
  private val quotaSampleSql =
    """SELECT lang, doc_id FROM (
         SELECT lang, doc_id,
           row_number() OVER (PARTITION BY lang
             ORDER BY ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT,
                      doc_id) AS rn
         FROM documents)
       WHERE rn <= 20"""

  /** The full NB train+score chain (shared: the q113 gate and the
    * q152 calibration oracle both replay it). */
  private val q113OracleSql: String =
      """WITH sp AS (
           SELECT doc_id, text, lang,
             CASE WHEN ('0x' || substring(md5(text), 1, 15))::BIGINT % 100 < 80
                  THEN 'train' ELSE 'rest' END AS split
           FROM documents),
         tr AS (SELECT * FROM sp WHERE split = 'train'),
         te AS (SELECT * FROM sp WHERE split <> 'train'),
         tev AS (SELECT lang AS lbl, unnest(string_split(trim(text), ' ')) AS t FROM tr),
         ct AS (SELECT lbl, t, CAST(count(*) AS BIGINT) AS cwt FROM tev GROUP BY 1, 2),
         tot AS (SELECT lbl, CAST(count(*) AS BIGINT) AS nt FROM tev GROUP BY 1),
         pr AS (SELECT lang AS lbl, CAST(count(*) AS BIGINT) AS nd FROM tr GROUP BY 1),
         nd AS (SELECT CAST(count(*) AS BIGINT) AS ndocs FROM tr),
         vb AS (SELECT CAST(count(DISTINCT t) AS BIGINT) AS v FROM tev),
         cls AS (SELECT tot.lbl, tot.nt,
                   CAST(round(1e6 * ln(pr.nd * 1.0 / nd.ndocs)) AS BIGINT) AS prior
                 FROM tot JOIN pr USING (lbl) CROSS JOIN nd),
         ev AS (SELECT doc_id, unnest(string_split(trim(text), ' ')) AS t FROM te),
         term AS (
           SELECT ev.doc_id, cls.lbl, cls.prior,
             CAST(round(1e6 * ln((COALESCE(ct.cwt, 0) + 1.0) /
               (cls.nt + 1.0 * vb.v))) AS BIGINT) AS ll
           FROM ev CROSS JOIN cls
           LEFT JOIN ct ON ct.lbl = cls.lbl AND ct.t = ev.t
           CROSS JOIN vb),
         post AS (SELECT doc_id, lbl, prior + CAST(sum(ll) AS BIGINT) AS post
                  FROM term GROUP BY 1, 2, prior),
         r AS (SELECT doc_id, lbl, post,
                 row_number() OVER (PARTITION BY doc_id ORDER BY post DESC, lbl) AS rn,
                 lead(post) OVER (PARTITION BY doc_id ORDER BY post DESC, lbl) AS post2
               FROM post)
         SELECT doc_id, lbl AS label_pred, post AS score_micro,
           post - post2 AS margin_micro
         FROM r WHERE rn = 1"""

  val oracles: Map[String, String] = Map(
    "q148_length_batches" ->
      """WITH b AS (SELECT doc_id, n_chars,
           CASE WHEN n_chars < 200 THEN 0 WHEN n_chars < 400 THEN 1
                WHEN n_chars < 800 THEN 2 ELSE 3 END AS bucket,
           ('0x' || substring(md5(CAST(doc_id AS VARCHAR) || '#batch'), 1, 15))::BIGINT AS h
           FROM documents),
         r AS (SELECT doc_id, n_chars, bucket,
             row_number() OVER (PARTITION BY bucket ORDER BY h, doc_id) - 1 AS rnk
           FROM b)
         SELECT doc_id, n_chars, CAST(bucket AS INT) AS bucket,
           CAST(rnk // 16 AS BIGINT) AS batch_id, CAST(rnk % 16 AS INT) AS pos
         FROM r""",
    "q137_span_corrupt" ->
      """WITH base AS (SELECT doc_id, string_split(trim(text), ' ') AS arr FROM documents),
         tk AS (SELECT doc_id,
             unnest(list_transform(generate_series(1, len(arr)),
               i -> struct_pack(idx := i - 1, tok := arr[i]))) AS u
           FROM base),
         t2 AS (SELECT doc_id, u.idx AS idx, u.tok AS tok,
             (('0x' || substring(md5(CAST(doc_id AS VARCHAR) || '|' ||
               CAST(u.idx // 3 AS VARCHAR) || '|t5'), 1, 15))::BIGINT % 100 < 15) AS m
           FROM tk),
         t3 AS (SELECT *,
             CASE WHEN m AND NOT coalesce(lag(m) OVER (PARTITION BY doc_id ORDER BY idx), FALSE)
                  THEN 1 ELSE 0 END AS st
           FROM t2),
         t4 AS (SELECT *,
             CAST(sum(st) OVER (PARTITION BY doc_id ORDER BY idx
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS INT) - 1 AS k
           FROM t3)
         SELECT doc_id,
           md5(coalesce(string_agg(CASE WHEN NOT m THEN tok
                 WHEN st = 1 THEN '<X' || k || '>' END, ' ' ORDER BY idx), '')) AS corr_md5,
           md5(coalesce(string_agg(CASE WHEN m AND st = 1 THEN '<X' || k || '> ' || tok
                 WHEN m THEN tok END, ' ' ORDER BY idx), '')) AS tgt_md5,
           CAST(sum(CASE WHEN m THEN 1 ELSE 0 END) AS BIGINT) AS n_masked,
           CAST(sum(st) AS BIGINT) AS n_spans
         FROM t4 GROUP BY doc_id""",
    "q138_rebalanced_mixture" ->
      """WITH stats AS (
           SELECT lang, CAST(sum(n_chars) AS BIGINT) AS toks FROM documents
           WHERE lang IN ('en', 'de', 'fr', 'zh') GROUP BY 1),
         tot AS (SELECT CAST(sum(toks) AS BIGINT) AS t FROM stats),
         w AS (SELECT lang, 0.25 * t / toks AS wt FROM stats, tot),
         d AS (SELECT doc_id, documents.lang, wt,
             ('0x' || substring(md5(doc_id::VARCHAR || '#mix'), 1, 15))::BIGINT
               / 1152921504606846976.0 AS u
           FROM documents JOIN w USING (lang)),
         c AS (SELECT doc_id, lang,
             CAST(floor(wt) + CASE WHEN u < wt - floor(wt) THEN 1 ELSE 0 END AS INT) AS copies
           FROM d)
         SELECT doc_id, lang, CAST(k.k AS INT) AS copy_idx
         FROM c JOIN (SELECT unnest(generate_series(0,
           (SELECT CAST(max(copies) AS BIGINT) FROM c))) AS k) k ON k.k < copies""",
    "q131_fim" ->
      """WITH c AS (
           SELECT doc_id, text, length(text) AS len,
             ('0x' || substring(md5(concat_ws('|', CAST(doc_id AS VARCHAR), 'fim-a', text)), 1, 15))::BIGINT
               % (length(text) + 1) AS ca,
             ('0x' || substring(md5(concat_ws('|', CAST(doc_id AS VARCHAR), 'fim-b', text)), 1, 15))::BIGINT
               % (length(text) + 1) AS cb
           FROM documents),
         s AS (
           SELECT doc_id, text, len, least(ca, cb) AS lo, greatest(ca, cb) AS hi,
                  (len >= 64) AS app
           FROM c),
         p AS (
           SELECT doc_id, app, text,
             CASE WHEN app THEN substring(text, 1, CAST(lo AS INT)) ELSE text END AS prefix,
             CASE WHEN app THEN substring(text, CAST(lo + 1 AS INT), CAST(hi - lo AS INT)) ELSE '' END AS middle,
             CASE WHEN app THEN substring(text, CAST(hi + 1 AS INT), CAST(len - hi AS INT)) ELSE '' END AS suffix
           FROM s)
         SELECT doc_id, CAST(app AS INT) AS fim_applied,
           length(prefix) AS n_pre, length(middle) AS n_mid, length(suffix) AS n_suf,
           md5(CASE WHEN app
               THEN '<|fim_pre|>' || prefix || '<|fim_suf|>' || suffix || '<|fim_mid|>' || middle
               ELSE text END) AS fim_md5
         FROM p""",
    "q119_winnow_incremental" ->
      """WITH t AS (SELECT doc_id, string_split(trim(text), ' ') AS toks FROM documents),
         g AS (SELECT doc_id, k.k AS pos, len(toks) - 2 AS ng,
             ('0x' || substring(md5(array_to_string(toks[k.k : k.k + 2], ' ')), 1, 15))::BIGINT AS h
           FROM t JOIN (SELECT unnest(generate_series(1,
             (SELECT CAST(max(len(toks)) AS BIGINT) FROM t))) AS k) k
             ON k.k <= len(toks) - 2),
         wm AS (SELECT doc_id, pos, ng,
             min(h) OVER (PARTITION BY doc_id ORDER BY pos
               ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS mh
           FROM g),
         f AS (SELECT DISTINCT doc_id, mh FROM wm WHERE pos <= ng - 3)
         SELECT a.doc_id, b.doc_id AS hist_id,
           CAST(count(*) AS BIGINT) AS shared_fingerprints
         FROM f a JOIN f b ON a.mh = b.mh
         WHERE a.doc_id % 10 = 0 AND b.doc_id % 10 <> 0
         GROUP BY 1, 2 HAVING count(*) >= 2""",
    "q118_curation_v4" ->
      """WITH sp AS (
           SELECT doc_id, text, lang, n_chars,
             CASE WHEN ('0x' || substring(md5(text), 1, 15))::BIGINT % 100 < 80
                  THEN 'train' ELSE 'rest' END AS split
           FROM documents),
         tr AS (SELECT * FROM sp WHERE split = 'train'),
         tev AS (SELECT lang AS lbl, unnest(string_split(trim(text), ' ')) AS t FROM tr),
         ct AS (SELECT lbl, t, CAST(count(*) AS BIGINT) AS cwt FROM tev GROUP BY 1, 2),
         tot AS (SELECT lbl, CAST(count(*) AS BIGINT) AS nt FROM tev GROUP BY 1),
         pr AS (SELECT lang AS lbl, CAST(count(*) AS BIGINT) AS nd FROM tr GROUP BY 1),
         nd AS (SELECT CAST(count(*) AS BIGINT) AS ndocs FROM tr),
         vb AS (SELECT CAST(count(DISTINCT t) AS BIGINT) AS v FROM tev),
         cls AS (SELECT tot.lbl, tot.nt,
                   CAST(round(1e6 * ln(pr.nd * 1.0 / nd.ndocs)) AS BIGINT) AS prior
                 FROM tot JOIN pr USING (lbl) CROSS JOIN nd),
         ev AS (SELECT doc_id, unnest(string_split(trim(text), ' ')) AS t FROM documents),
         term AS (
           SELECT ev.doc_id, cls.lbl, cls.prior,
             CAST(round(1e6 * ln((COALESCE(ct.cwt, 0) + 1.0) /
               (cls.nt + 1.0 * vb.v))) AS BIGINT) AS ll
           FROM ev CROSS JOIN cls
           LEFT JOIN ct ON ct.lbl = cls.lbl AND ct.t = ev.t
           CROSS JOIN vb),
         post AS (SELECT doc_id, lbl, prior + CAST(sum(ll) AS BIGINT) AS post
                  FROM term GROUP BY 1, 2, prior),
         pred AS (SELECT doc_id, lbl AS label_pred FROM (
             SELECT doc_id, lbl, row_number() OVER
               (PARTITION BY doc_id ORDER BY post DESC, lbl) AS rn
             FROM post) WHERE rn = 1),
         kept AS (SELECT d.doc_id, d.text, d.n_chars FROM documents d
                  JOIN pred p ON p.doc_id = d.doc_id AND p.label_pred = d.lang),
         t2 AS (SELECT doc_id, string_split(trim(text), ' ') AS toks FROM kept),
         g2 AS (SELECT doc_id, k.k AS pos, len(toks) - 2 AS ng,
             ('0x' || substring(md5(array_to_string(toks[k.k : k.k + 2], ' ')), 1, 15))::BIGINT AS h
           FROM t2 JOIN (SELECT unnest(generate_series(1,
             (SELECT CAST(max(len(toks)) AS BIGINT) FROM t2))) AS k) k
             ON k.k <= len(toks) - 2),
         wm2 AS (SELECT doc_id, pos, ng,
             min(h) OVER (PARTITION BY doc_id ORDER BY pos
               ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS mh
           FROM g2),
         f2 AS (SELECT DISTINCT doc_id, mh FROM wm2 WHERE pos <= ng - 3),
         p2 AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
                FROM f2 a JOIN f2 b ON a.mh = b.mh AND a.doc_id < b.doc_id
                GROUP BY 1, 2 HAVING count(*) >= 2),
         surv AS (SELECT doc_id, n_chars FROM kept
                  WHERE doc_id NOT IN (SELECT id_b FROM p2)),
         s3 AS (SELECT doc_id, n_chars,
             ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS h
           FROM surv)
         SELECT CAST(h % 8 AS INT) AS shard_id,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(n_chars) AS BIGINT) AS total_bytes,
           CAST(sum(h % 1073741824) AS BIGINT) AS content_sum,
           min(doc_id) AS min_key, max(doc_id) AS max_key
         FROM s3 GROUP BY 1""",
    "q117_winnow_pairs" ->
      """WITH t AS (SELECT doc_id, string_split(trim(text), ' ') AS toks FROM documents),
         g AS (SELECT doc_id, k.k AS pos, len(toks) - 2 AS ng,
             ('0x' || substring(md5(array_to_string(toks[k.k : k.k + 2], ' ')), 1, 15))::BIGINT AS h
           FROM t JOIN (SELECT unnest(generate_series(1,
             (SELECT CAST(max(len(toks)) AS BIGINT) FROM t))) AS k) k
             ON k.k <= len(toks) - 2),
         wm AS (SELECT doc_id, pos, ng,
             min(h) OVER (PARTITION BY doc_id ORDER BY pos
               ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS mh
           FROM g),
         f AS (SELECT DISTINCT doc_id, mh FROM wm WHERE pos <= ng - 3)
         SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(count(*) AS BIGINT) AS shared_fingerprints
         FROM f a JOIN f b ON a.mh = b.mh AND a.doc_id < b.doc_id
         GROUP BY 1, 2 HAVING count(*) >= 2""",
    "q113_nb_classify" -> q113OracleSql,
    "q152_calibration" ->
      s"""WITH pred AS ($q113OracleSql),
          truth AS (
            SELECT doc_id, lang FROM documents
            WHERE ('0x' || substring(md5(text), 1, 15))::BIGINT % 100 >= 80),
          j AS (SELECT p.doc_id, p.margin_micro AS s,
                  CASE WHEN p.label_pred = t.lang THEN 1 ELSE 0 END AS ok
                FROM pred p JOIN truth t ON p.doc_id = t.doc_id),
          st AS (SELECT min(s) AS lo, max(s) AS hi FROM j),
          b AS (SELECT CAST(CASE WHEN st.hi = st.lo THEN 0
                  ELSE ((s - st.lo) * 10 - (((s - st.lo) * 10) % (st.hi - st.lo + 1)))
                       / (st.hi - st.lo + 1) END AS INT) AS bin,
                  s, ok
                FROM j CROSS JOIN st)
          SELECT bin, count(*) AS n, CAST(sum(ok) AS BIGINT) AS n_correct,
            CAST((1000000 * sum(ok) - ((1000000 * sum(ok)) % count(*))) / count(*) AS BIGINT) AS acc_micro,
            min(s) AS min_score, max(s) AS max_score
          FROM b GROUP BY 1""",
    "q112_source_drift" ->
      """WITH t AS (SELECT source, string_split(trim(text), ' ') AS toks FROM documents),
         tok AS (SELECT source,
             ('0x' || substring(md5(toks[k.k]), 1, 15))::BIGINT % 4096 AS b
           FROM t JOIN (SELECT unnest(generate_series(1,
             (SELECT CAST(max(len(toks)) AS BIGINT) FROM t))) AS k) k
             ON k.k <= len(toks)),
         gc AS (SELECT source, b, CAST(count(*) AS BIGINT) AS cg FROM tok GROUP BY 1, 2),
         cc AS (SELECT b, CAST(sum(cg) AS BIGINT) AS cc FROM gc GROUP BY 1),
         gt AS (SELECT source, CAST(sum(cg) AS BIGINT) AS ng FROM gc GROUP BY 1),
         st AS (SELECT (SELECT CAST(sum(cc) AS BIGINT) FROM cc) AS n,
                       (SELECT CAST(count(*) AS BIGINT) FROM cc) AS nobs),
         terms AS (
           SELECT gt.source, gt.ng,
             CAST(round(1e9 * ((COALESCE(gc.cg, 0) + 1.0) / (gt.ng + 4096.0)) *
               (ln((COALESCE(gc.cg, 0) + 1.0) / (gt.ng + 4096.0)) -
                ln((cc.cc + 1.0) / (st.n + 4096.0)))) AS BIGINT) AS kl,
             CAST(round(1e9 * 0.5 * abs((COALESCE(gc.cg, 0) + 1.0) / (gt.ng + 4096.0) -
               (cc.cc + 1.0) / (st.n + 4096.0))) AS BIGINT) AS tv
           FROM gt CROSS JOIN cc
           LEFT JOIN gc ON gc.source = gt.source AND gc.b = cc.b
           CROSS JOIN st),
         obs AS (SELECT source, ng, CAST(sum(kl) AS BIGINT) AS klobs,
                        CAST(sum(tv) AS BIGINT) AS tvobs
                 FROM terms GROUP BY 1, 2)
         SELECT source, ng AS n_tokens,
           klobs + (4096 - st.nobs) * CAST(round(1e9 * (1.0 / (ng + 4096.0)) *
             (ln(1.0 / (ng + 4096.0)) - ln(1.0 / (st.n + 4096.0)))) AS BIGINT) AS kl_nano,
           tvobs + (4096 - st.nobs) * CAST(round(1e9 * 0.5 *
             abs(1.0 / (ng + 4096.0) - 1.0 / (st.n + 4096.0))) AS BIGINT) AS tv_nano
         FROM obs CROSS JOIN st""",
    "q110_shard_manifest" ->
      """WITH s AS (
           SELECT doc_id, n_chars,
             ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS h
           FROM documents
         )
         SELECT CAST(h % 8 AS INT) AS shard_id,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(n_chars) AS BIGINT) AS total_bytes,
           CAST(sum(h % 1073741824) AS BIGINT) AS content_sum,
           min(doc_id) AS min_key, max(doc_id) AS max_key
         FROM s GROUP BY 1""",
    "q100_curation_v3" -> {
      val cases = V3Budgets.map { case (l, b) =>
        s"(lang = '$l' AND cum_before < $b)"
      }.mkString(" OR ")
      s"""WITH aug AS (SELECT doc_id,
             CASE WHEN doc_id % 3 = 0 THEN text || '$Boiler' ELSE text END AS text
           FROM documents),
         t AS (SELECT doc_id, string_split(trim(text), ' ') AS toks FROM aug),
         ks AS (SELECT unnest(generate_series(0,
           (SELECT CAST(max(len(toks)) AS BIGINT) FROM t))) AS k),
         tok AS (SELECT doc_id, CAST(ks.k AS INT) AS pos, toks[ks.k + 1] AS tok
                 FROM t JOIN ks ON ks.k < len(toks)),
         g AS (SELECT doc_id, CAST(ks.k AS INT) AS gpos,
                 array_to_string(toks[ks.k + 1 : ks.k + 5], ' ') AS gram
               FROM t JOIN ks ON ks.k <= len(toks) - 5),
         common AS (SELECT gram FROM g GROUP BY gram
                    HAVING count(DISTINCT doc_id) >= 10),
         cov AS (SELECT DISTINCT g.doc_id, g.gpos + o.o AS pos
                 FROM g JOIN common USING (gram)
                 CROSS JOIN (SELECT unnest(generate_series(0, 4)) AS o) o),
         keptt AS (SELECT tok.doc_id, tok.pos, tok.tok
                   FROM tok LEFT JOIN cov
                     ON tok.doc_id = cov.doc_id AND tok.pos = cov.pos
                   WHERE cov.pos IS NULL),
         reb AS (SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS clean_text
                 FROM keptt GROUP BY doc_id),
         clean AS (SELECT t.doc_id, COALESCE(reb.clean_text, '') AS text
                   FROM t LEFT JOIN reb USING (doc_id)),
         ct AS (SELECT doc_id, string_split(trim(text), ' ') AS toks FROM clean),
         cks AS (SELECT unnest(generate_series(0,
           (SELECT CAST(max(len(toks)) AS BIGINT) FROM ct))) AS k),
         ev AS (
           SELECT doc_id, CAST(cks.k AS BIGINT) AS p, toks[cks.k + 1] AS cur,
             CASE WHEN cks.k > 0 THEN toks[cks.k] END AS prev
           FROM ct JOIN cks ON cks.k < len(toks)),
         uni AS (SELECT cur AS w, CAST(count(*) AS BIGINT) AS cu FROM ev GROUP BY cur),
         st AS (SELECT CAST(sum(cu) AS BIGINT) AS n, CAST(count(*) AS BIGINT) AS v FROM uni),
         bi AS (SELECT prev, cur, CAST(count(*) AS BIGINT) AS cb
                FROM ev WHERE p > 0 GROUP BY prev, cur),
         sc AS (
           SELECT ev.doc_id,
             CAST(round(1000000.0 * -ln((CAST(u.cu AS DOUBLE) + 0.1) /
               (CAST(st.n AS DOUBLE) + 0.1 * CAST(st.v AS DOUBLE)))) AS BIGINT) AS nll
           FROM ev JOIN uni u ON ev.cur = u.w CROSS JOIN st WHERE ev.p = 0
           UNION ALL
           SELECT ev.doc_id,
             CAST(round(1000000.0 * -ln((CAST(bi.cb AS DOUBLE) + 0.1) /
               (CAST(u.cu AS DOUBLE) + 0.1 * CAST(st.v AS DOUBLE)))) AS BIGINT) AS nll
           FROM ev JOIN bi ON ev.prev = bi.prev AND ev.cur = bi.cur
             JOIN uni u ON ev.prev = u.w CROSS JOIN st WHERE ev.p > 0),
         lm AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
                  CAST(sum(nll) AS BIGINT) AS nll_micro
                FROM sc GROUP BY doc_id),
         keptd AS (SELECT d.lang, lm.doc_id, lm.n_tokens
                   FROM lm JOIN documents d USING (doc_id)
                   WHERE lm.nll_micro <= 3400000 * lm.n_tokens),
         cum AS (SELECT lang, doc_id, n_tokens,
                   COALESCE(CAST(sum(n_tokens) OVER (PARTITION BY lang
                     ORDER BY ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT,
                              doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0)
                     AS cum_before
                 FROM keptd)
         SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS tokens
         FROM cum WHERE $cases GROUP BY lang"""
    },
    "q99_token_budget" -> {
      val cases = LangBudgets.map { case (l, b) =>
        s"(lang = '$l' AND cum_before < $b)"
      }.mkString(" OR ")
      s"""WITH t AS (SELECT lang, doc_id,
             CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS n_tokens
           FROM documents),
         c AS (SELECT lang, doc_id, n_tokens,
                 COALESCE(CAST(sum(n_tokens) OVER (PARTITION BY lang
                   ORDER BY ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT,
                            doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0)
                   AS cum_before
               FROM t)
         SELECT lang, doc_id, n_tokens, cum_before FROM c WHERE $cases"""
    },
    "q96_strip_spans" ->
      s"""WITH aug AS (SELECT doc_id,
             CASE WHEN doc_id % 3 = 0 THEN text || '$Boiler' ELSE text END AS text
           FROM documents),
         t AS (SELECT doc_id, string_split(trim(text), ' ') AS toks FROM aug),
         ks AS (SELECT unnest(generate_series(0,
           (SELECT CAST(max(len(toks)) AS BIGINT) FROM t))) AS k),
         tok AS (SELECT doc_id, CAST(ks.k AS INT) AS pos, toks[ks.k + 1] AS tok
                 FROM t JOIN ks ON ks.k < len(toks)),
         g AS (SELECT doc_id, CAST(ks.k AS INT) AS gpos,
                 array_to_string(toks[ks.k + 1 : ks.k + 5], ' ') AS gram
               FROM t JOIN ks ON ks.k <= len(toks) - 5),
         common AS (SELECT gram FROM g GROUP BY gram
                    HAVING count(DISTINCT doc_id) >= 10),
         cov AS (SELECT DISTINCT g.doc_id, g.gpos + o.o AS pos
                 FROM g JOIN common USING (gram)
                 CROSS JOIN (SELECT unnest(generate_series(0, 4)) AS o) o),
         kept AS (SELECT tok.doc_id, tok.pos, tok.tok
                  FROM tok LEFT JOIN cov
                    ON tok.doc_id = cov.doc_id AND tok.pos = cov.pos
                  WHERE cov.pos IS NULL),
         reb AS (SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS clean_text,
                   CAST(count(*) AS BIGINT) AS n_kept
                 FROM kept GROUP BY doc_id)
         SELECT t.doc_id, COALESCE(reb.clean_text, '') AS clean_text,
           CAST(len(t.toks) AS BIGINT) AS n_tokens,
           COALESCE(reb.n_kept, 0) AS n_kept
         FROM t LEFT JOIN reb USING (doc_id)""",
    "q92_lm_score" ->
      """WITH t AS (SELECT doc_id, string_split(trim(text), ' ') AS toks FROM documents),
         ev AS (
           SELECT doc_id, CAST(k.k AS BIGINT) AS p, toks[k.k + 1] AS cur,
             CASE WHEN k.k > 0 THEN toks[k.k] END AS prev
           FROM t JOIN (SELECT unnest(generate_series(0,
             (SELECT CAST(max(len(toks)) AS BIGINT) FROM t))) AS k) k
             ON k.k < len(toks)),
         uni AS (SELECT cur AS w, CAST(count(*) AS BIGINT) AS cu FROM ev GROUP BY cur),
         st AS (SELECT CAST(sum(cu) AS BIGINT) AS n, CAST(count(*) AS BIGINT) AS v FROM uni),
         bi AS (SELECT prev, cur, CAST(count(*) AS BIGINT) AS cb
                FROM ev WHERE p > 0 GROUP BY prev, cur),
         sc AS (
           SELECT ev.doc_id,
             CAST(round(1000000.0 * -ln((CAST(u.cu AS DOUBLE) + 0.1) /
               (CAST(st.n AS DOUBLE) + 0.1 * CAST(st.v AS DOUBLE)))) AS BIGINT) AS nll
           FROM ev JOIN uni u ON ev.cur = u.w CROSS JOIN st WHERE ev.p = 0
           UNION ALL
           SELECT ev.doc_id,
             CAST(round(1000000.0 * -ln((CAST(bi.cb AS DOUBLE) + 0.1) /
               (CAST(u.cu AS DOUBLE) + 0.1 * CAST(st.v AS DOUBLE)))) AS BIGINT) AS nll
           FROM ev JOIN bi ON ev.prev = bi.prev AND ev.cur = bi.cur
             JOIN uni u ON ev.prev = u.w CROSS JOIN st WHERE ev.p > 0),
         agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
                   CAST(sum(nll) AS BIGINT) AS nll_micro
                 FROM sc GROUP BY doc_id)
         SELECT doc_id, n_tokens, nll_micro,
           nll_micro <= 3400000 * n_tokens AS keep
         FROM agg""",
    "q88_paragraph_dedup" ->
      """WITH aug AS (
           SELECT doc_id, text || '. shared sentence alpha variant ' || (doc_id % 5) ||
             '. shared sentence beta variant ' || (doc_id % 7) AS text
           FROM documents),
         t AS (SELECT doc_id, string_split(text, '. ') AS ps FROM aug),
         p AS (
           SELECT doc_id, CAST(k.k AS INT) AS pos, ps[k.k] AS para
           FROM t JOIN (SELECT unnest(generate_series(1,
             (SELECT CAST(max(len(ps)) AS BIGINT) FROM t))) AS k) k
             ON k.k <= len(ps)
           WHERE length(ps[k.k]) > 0),
         r AS (
           SELECT doc_id, pos, para,
             row_number() OVER (PARTITION BY para ORDER BY doc_id, pos) AS rn
           FROM p),
         reb AS (
           SELECT doc_id,
             string_agg(CASE WHEN rn = 1 THEN para END, '. ' ORDER BY pos) AS clean_text,
             CAST(count(*) AS BIGINT) AS n_paras,
             CAST(count(CASE WHEN rn = 1 THEN 1 END) AS BIGINT) AS n_kept
           FROM r GROUP BY doc_id)
         SELECT d.doc_id,
           COALESCE(reb.clean_text, '') AS clean_text,
           COALESCE(reb.n_paras, 0) AS n_paras,
           COALESCE(reb.n_kept, 0) AS n_kept
         FROM documents d LEFT JOIN reb USING (doc_id)""",
    "q86_url_blocklist" ->
      s"""WITH aug AS (
           SELECT doc_id, text || ' see https://site' || (doc_id % 7) ||
             '.example.com/p/' || doc_id ||
             CASE WHEN doc_id % 4 = 0
               THEN ' and HTTP://BLOCKED' || (doc_id % 3) || '.BAD.EXAMPLE.ORG/x'
               WHEN doc_id % 2 = 0
               THEN ' and http://blocked' || (doc_id % 3) || '.bad.example.org/x'
               ELSE '' END ||
             CASE WHEN doc_id % 5 = 0
               THEN ' plus https://innocent.com@deep' || (doc_id % 3) || '.bad.example.org/y'
               ELSE '' END AS text
           FROM documents),
         h AS (
           SELECT doc_id,
             regexp_extract_all(lower(text),
               '${graft.operators.TextOps.UrlRe}', 1) AS hosts
           FROM aug),
         c AS (
           SELECT doc_id,
             CAST(len(hosts) AS INT) AS n_urls,
             CAST(len(list_filter(hosts, x ->
               x = 'bad.example.org' OR ends_with(x, '.bad.example.org') OR
               x = 'site3.example.com' OR ends_with(x, '.site3.example.com')))
               AS INT) AS n_blocked
           FROM h)
         SELECT doc_id, n_urls, n_blocked, n_blocked = 0 AS keep FROM c""",
    "q85_bm25_batch" -> bm25Sql,
    "q101_dsir_select" ->
      s"""WITH $dsirCtesSql
         SELECT doc_id, n_grams, score_micro FROM sc
         ORDER BY score_micro DESC, doc_id LIMIT 50""",
    "q105_dsir_resample" ->
      s"""WITH $dsirCtesSql,
         sel AS (SELECT doc_id, n_grams, score_micro,
                   score_micro + CAST(round(2000000.0 * -ln(-ln(
                     (('0x' || substring(md5(CAST(doc_id AS VARCHAR) || '#gumbel'), 1, 15))::BIGINT
                       + 0.5) / 1152921504606846976.0))) AS BIGINT) AS key_micro
                 FROM sc)
         SELECT doc_id, n_grams, score_micro, key_micro FROM sel
         ORDER BY key_micro DESC, doc_id LIMIT 50""",
    "q102_tfidf_keywords" ->
      """WITH t AS (SELECT doc_id, unnest(string_split(trim(text), ' ')) AS term
                    FROM documents),
         tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
                FROM t GROUP BY doc_id, term),
         dfx AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
         n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
         sc AS (SELECT tf.doc_id, tf.term, tf.tf, dfx.df,
                  CAST(round(1000000.0 * tf.tf *
                    (ln((n.n + 1.0) / (dfx.df + 1.0)) + 1.0)) AS BIGINT) AS score_micro
                FROM tf JOIN dfx USING (term) CROSS JOIN n)
         SELECT doc_id, term, tf, df, score_micro FROM sc
         QUALIFY row_number() OVER (PARTITION BY doc_id
           ORDER BY score_micro DESC, term) <= 5""",
    "q103_stratified_split" ->
      """WITH cnt AS (SELECT lang, CAST(count(*) AS BIGINT) AS n
                      FROM documents GROUP BY lang),
         sp AS (SELECT * FROM (VALUES ('train', 900000, 0), ('val', 50000, 1),
                  ('test', 50000, 2)) AS v(split, ppm, idx)),
         a AS (SELECT lang, n, split, idx,
                 CAST((n * ppm - (n * ppm) % 1000000) / 1000000 AS BIGINT) AS fl,
                 CAST((n * ppm) % 1000000 AS BIGINT) AS rem
               FROM cnt CROSS JOIN sp),
         b AS (SELECT lang, split, idx, fl, rem,
                 n - CAST(sum(fl) OVER (PARTITION BY lang) AS BIGINT) AS short,
                 row_number() OVER (PARTITION BY lang ORDER BY rem DESC, idx) AS rk
               FROM a),
         c AS (SELECT lang, split, idx,
                 fl + CASE WHEN rk <= short THEN 1 ELSE 0 END AS c FROM b),
         d AS (SELECT lang, split, c,
                 CAST(COALESCE(sum(c) OVER (PARTITION BY lang ORDER BY idx
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS lo
               FROM c),
         r AS (SELECT lang, doc_id,
                 row_number() OVER (PARTITION BY lang ORDER BY
                   ('0x' || substring(md5(CAST(doc_id AS VARCHAR) || '#split'), 1, 15))::BIGINT,
                   doc_id) AS rn
               FROM documents)
         SELECT r.lang, r.doc_id, d.split
         FROM r JOIN d ON r.lang = d.lang AND r.rn > d.lo AND r.rn <= d.lo + d.c""",
    "q84_quota_sample_agg" -> quotaSampleSql,
    "q83_normalize_unicode" ->
      s"""WITH n AS (
           SELECT doc_id,
             trim(regexp_replace(regexp_replace(
               lower(nfc_normalize(text || '$UniTail')),
               '[^\\p{L}\\p{N}\\s]', ' ', 'g'), '\\s+', ' ', 'g')) AS norm_text
           FROM documents)
         SELECT doc_id, norm_text,
           CAST(len(string_split(norm_text, ' ')) AS INT) AS n_tokens
         FROM n""",
    "q80_quota_sample" -> quotaSampleSql,
    "q81_normalize" ->
      """WITH n AS (
           SELECT doc_id,
             trim(regexp_replace(regexp_replace(
               lower(text || ' THE QUICK!! Brown-Fox;  jumps 42 '),
               '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g')) AS norm_text
           FROM documents)
         SELECT doc_id, norm_text,
           CAST(len(string_split(norm_text, ' ')) AS INT) AS n_tokens
         FROM n""",
    "q121_html_extract" ->
      s"""WITH aug AS (
           $htmlShellSql
         ), x AS (
           SELECT doc_id,
             $htmlExtractSql
           FROM aug
         )
         SELECT doc_id, plain_text,
           CAST(length(plain_text) AS INT) AS n_chars
         FROM x""",
    "q122_sentence_split" ->
      s"""WITH aug AS (
           ${sentAugSql("documents", "text")}
         ), ${sentSplitCtesSql("aug")}
         SELECT doc_id, sent_idx, sentence,
           CAST(length(sentence) AS INT) AS sent_chars
         FROM x""",
    "q124_sentence_chunks" ->
      s"""WITH aug AS (
           ${sentAugSql("documents", "text")}
         ), ${sentSplitCtesSql("aug")}, t AS (
           SELECT doc_id, sent_idx, sentence,
             CAST(len(string_split(sentence, ' ')) AS BIGINT) AS nt
           FROM x
         ), c AS (
           SELECT doc_id, sent_idx, sentence, nt,
             COALESCE(SUM(nt) OVER (PARTITION BY doc_id ORDER BY sent_idx
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
           FROM t
         )
         SELECT doc_id, CAST(cb // 64 AS BIGINT) AS chunk_id,
           string_agg(sentence, ' ' ORDER BY sent_idx) AS chunk_text,
           CAST(count(*) AS BIGINT) AS n_sents,
           CAST(sum(nt) AS BIGINT) AS n_tokens
         FROM c GROUP BY doc_id, cb // 64""",
    "q127_curation_v5" ->
      s"""WITH aug AS (
           $htmlShellSql
         ), px AS (
           SELECT doc_id,
             $htmlExtractSql
           FROM aug
         ), saug AS (
           ${sentAugSql("px", "plain_text")}
         ), ${sentSplitCtesSql("saug")}, r AS (
           SELECT doc_id, sent_idx, sentence,
             row_number() OVER (PARTITION BY sentence
               ORDER BY doc_id, sent_idx) AS rn
           FROM x
         ), keep AS (
           SELECT doc_id, sent_idx, sentence,
             CAST(len(string_split(sentence, ' ')) AS BIGINT) AS nt
           FROM r WHERE rn = 1
         ), c AS (
           SELECT doc_id, sent_idx, nt,
             COALESCE(SUM(nt) OVER (PARTITION BY doc_id ORDER BY sent_idx
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
           FROM keep
         ), ch AS (
           SELECT doc_id, CAST(cb // 64 AS BIGINT) AS chunk_id,
             CAST(sum(nt) AS BIGINT) AS n_tokens
           FROM c GROUP BY doc_id, cb // 64
         ), e AS (
           SELECT doc_id, chunk_id, n_tokens,
             CAST(doc_id AS VARCHAR) || '#' || CAST(chunk_id AS VARCHAR) AS ck,
             CAST(k.k AS INT) AS epoch
           FROM ch CROSS JOIN (SELECT unnest(generate_series(0, 1)) AS k) k
         ), a AS (
           SELECT doc_id, chunk_id, n_tokens, ck, epoch,
             CAST(('0x' || substring(md5(ck || '#ep' || CAST(epoch AS VARCHAR)
               || '#shard'), 1, 15))::BIGINT % 8 AS INT) AS shard_id,
             ('0x' || substring(md5(ck || '#ep' || CAST(epoch AS VARCHAR)
               || '#ord'), 1, 15))::BIGINT AS u
           FROM e
         )
         SELECT epoch, shard_id,
           CAST(row_number() OVER (PARTITION BY epoch, shard_id
             ORDER BY u, ck) - 1 AS BIGINT) AS pos,
           doc_id, chunk_id, n_tokens
         FROM a""",
    "q126_sentence_dedup" ->
      s"""WITH aug AS (
           ${sentAugSql("documents", "text")}
         ), ${sentSplitCtesSql("aug")}, r AS (
           SELECT doc_id, sent_idx, sentence,
             row_number() OVER (PARTITION BY sentence
               ORDER BY doc_id, sent_idx) AS rn
           FROM x
         ), reb AS (
           SELECT doc_id,
             string_agg(CASE WHEN rn = 1 THEN sentence END, ' '
               ORDER BY sent_idx) AS clean_text,
             CAST(count(*) AS BIGINT) AS n_sents,
             CAST(count(CASE WHEN rn = 1 THEN 1 END) AS BIGINT) AS n_kept
           FROM r GROUP BY doc_id)
         SELECT d.doc_id,
           COALESCE(reb.clean_text, '') AS clean_text,
           COALESCE(reb.n_sents, 0) AS n_sents,
           COALESCE(reb.n_kept, 0) AS n_kept
         FROM documents d LEFT JOIN reb USING (doc_id)""",
    "q123_epoch_shuffle" ->
      """WITH e AS (
           SELECT doc_id, CAST(k.k AS INT) AS epoch
           FROM documents
           CROSS JOIN (SELECT unnest(generate_series(0, 1)) AS k) k
         ), a AS (
           SELECT doc_id, epoch,
             CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR) || '#ep' ||
               CAST(epoch AS VARCHAR) || '#shard'), 1, 15))::BIGINT % 4 AS INT)
               AS shard_id,
             ('0x' || substring(md5(CAST(doc_id AS VARCHAR) || '#ep' ||
               CAST(epoch AS VARCHAR) || '#ord'), 1, 15))::BIGINT AS u
           FROM e
         )
         SELECT epoch, shard_id,
           CAST(row_number() OVER (PARTITION BY epoch, shard_id
             ORDER BY u, doc_id) - 1 AS BIGINT) AS pos,
           doc_id
         FROM a""",
    "q77_curation_v2" ->
      s"""WITH aug AS (SELECT doc_id,
             CASE WHEN doc_id % 3 = 0 THEN text || '$Boiler' ELSE text END AS text
           FROM documents),
         t AS (SELECT doc_id, string_split(trim(text), ' ') AS toks FROM aug),
         g AS (
           SELECT doc_id, array_to_string(toks[k.k + 1 : k.k + 5], ' ') AS span_text
           FROM t JOIN (SELECT unnest(generate_series(0,
             (SELECT CAST(max(len(toks)) AS BIGINT) FROM t))) AS k) k
             ON k.k <= len(toks) - 5
         ),
         common AS (SELECT span_text FROM g GROUP BY span_text
                    HAVING count(DISTINCT doc_id) >= 10),
         com AS (SELECT doc_id, count(*) AS n_common FROM g
                 WHERE span_text IN (SELECT span_text FROM common) GROUP BY doc_id),
         bg AS (
           SELECT doc_id, array_to_string(toks[k.k + 1 : k.k + 2], ' ') AS ng
           FROM t JOIN (SELECT unnest(generate_series(0,
             (SELECT CAST(max(len(toks)) AS BIGINT) FROM t))) AS k) k
             ON k.k <= len(toks) - 2
         ),
         bc AS (SELECT doc_id, ng, count(*) AS c FROM bg GROUP BY doc_id, ng),
         bd AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_ngrams,
                       CAST(max(c) AS BIGINT) AS top_cnt
                FROM bc GROUP BY doc_id),
         kept AS (
           SELECT a.doc_id, a.text FROM aug a
           LEFT JOIN com USING (doc_id)
           JOIN bd USING (doc_id)
           WHERE COALESCE(com.n_common, 0) = 0
             AND CAST(bd.top_cnt AS DOUBLE) / CAST(bd.n_ngrams AS DOUBLE) <= 0.34
         ),
         sp AS (
           SELECT doc_id, text,
             CASE WHEN ('0x' || substring(md5(text), 1, 15))::BIGINT % 100 < 80 THEN 'train'
                  WHEN ('0x' || substring(md5(text), 1, 15))::BIGINT % 100 < 90 THEN 'valid'
                  ELSE 'test' END AS split
           FROM kept
         )
         SELECT d.lang, sp.split, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(len(string_split(trim(sp.text), ' '))) AS BIGINT) AS tokens
         FROM sp JOIN documents d USING (doc_id)
         GROUP BY d.lang, sp.split""",
    "q75_inverted_index" ->
      """WITH t AS (SELECT doc_id, unnest(string_split(trim(text), ' ')) AS term FROM documents),
         tf AS (SELECT term, doc_id, CAST(count(*) AS BIGINT) AS tf
                FROM t GROUP BY term, doc_id)
         SELECT term, CAST(count(*) AS BIGINT) AS df, CAST(sum(tf) AS BIGINT) AS total_tf,
           array_to_string((list(doc_id || ':' || tf ORDER BY doc_id))[1:25], ',') AS postings
         FROM tf GROUP BY term HAVING count(*) >= 2""",
    "q76_corpus_profile" ->
      """WITH t AS (SELECT source, lang, text,
             CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS n_tok FROM documents)
         SELECT source, lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tok) AS BIGINT) AS tokens,
           CAST(sum(length(text)) AS BIGINT) AS chars,
           CAST(sum(length(text)) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS chars_per_doc,
           quantile_cont(n_tok, 0.5) AS p50_tokens,
           quantile_cont(n_tok, 0.9) AS p90_tokens
         FROM t GROUP BY source, lang""",
    "q71_repetition_stats" ->
      """WITH t AS (SELECT doc_id, string_split(trim(text), ' ') AS toks FROM documents),
         g AS (
           SELECT doc_id, array_to_string(toks[k.k + 1 : k.k + 2], ' ') AS ng
           FROM t JOIN (SELECT unnest(generate_series(0,
             (SELECT CAST(max(len(toks)) AS BIGINT) FROM t))) AS k) k
             ON k.k <= len(toks) - 2
         ),
         c AS (SELECT doc_id, ng, count(*) AS c FROM g GROUP BY doc_id, ng),
         d AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_ngrams,
                      CAST(count(*) AS BIGINT) AS n_distinct,
                      CAST(max(c) AS BIGINT) AS top_cnt
               FROM c GROUP BY doc_id)
         SELECT doc_id,
           CAST(COALESCE(n_ngrams, 0) AS BIGINT) AS n_ngrams,
           CAST(COALESCE(n_distinct, 0) AS BIGINT) AS n_distinct,
           CAST(COALESCE(top_cnt, 0) AS BIGINT) AS top_cnt,
           CASE WHEN COALESCE(n_ngrams, 0) > 0
                THEN 1.0 - (CAST(n_distinct AS DOUBLE) / CAST(n_ngrams AS DOUBLE)) END AS dup_frac,
           CASE WHEN COALESCE(n_ngrams, 0) > 0
                THEN CAST(top_cnt AS DOUBLE) / CAST(n_ngrams AS DOUBLE) END AS top_frac
         FROM documents LEFT JOIN d USING (doc_id)""",
    "q72_bm25_search" ->
      """WITH t AS (SELECT doc_id, string_split(trim(text), ' ') AS toks FROM documents),
         dl AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl FROM t),
         st AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(dl) AS BIGINT) AS sumdl FROM dl),
         tf AS (SELECT doc_id, tok AS term, CAST(count(*) AS BIGINT) AS tf
                FROM (SELECT doc_id, unnest(toks) AS tok FROM t)
                WHERE tok IN ('spark', 'hash', 'merge', 'window')
                GROUP BY doc_id, tok),
         df AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
         c AS (
           SELECT tf.doc_id,
             CAST(round(1000000.0 * (
               ln((CAST(st.n - df.df AS DOUBLE) + 0.5) / (CAST(df.df AS DOUBLE) + 0.5) + 1.0)
               * ((CAST(tf.tf AS DOUBLE) * (1.2 + 1.0)) /
                  (CAST(tf.tf AS DOUBLE) + 1.2 * (1.0 - 0.75 + 0.75 *
                    (CAST(dl.dl AS DOUBLE) / (CAST(st.sumdl AS DOUBLE) / CAST(st.n AS DOUBLE))))))
             )) AS BIGINT) AS c
           FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN st
         )
         SELECT doc_id, CAST(sum(c) AS BIGINT) AS score_micro,
           CAST(count(*) AS BIGINT) AS n_terms
         FROM c GROUP BY doc_id
         ORDER BY score_micro DESC, doc_id LIMIT 10""",
    "q73_repeated_spans" ->
      s"""WITH aug AS (SELECT doc_id,
             CASE WHEN doc_id % 3 = 0 THEN text || '$Boiler' ELSE text END AS text
           FROM documents),
         t AS (SELECT doc_id, string_split(trim(text), ' ') AS toks FROM aug),
         g AS (
           SELECT doc_id, array_to_string(toks[k.k + 1 : k.k + 5], ' ') AS span_text
           FROM t JOIN (SELECT unnest(generate_series(0,
             (SELECT CAST(max(len(toks)) AS BIGINT) FROM t))) AS k) k
             ON k.k <= len(toks) - 5
         )
         SELECT span_text, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(count(*) AS BIGINT) AS n_occ
         FROM g GROUP BY span_text HAVING count(DISTINCT doc_id) >= 10""",
    "q74_boilerplate_coverage" ->
      s"""WITH aug AS (SELECT doc_id,
             CASE WHEN doc_id % 3 = 0 THEN text || '$Boiler' ELSE text END AS text
           FROM documents),
         t AS (SELECT doc_id, string_split(trim(text), ' ') AS toks FROM aug),
         g AS (
           SELECT doc_id, array_to_string(toks[k.k + 1 : k.k + 5], ' ') AS span_text
           FROM t JOIN (SELECT unnest(generate_series(0,
             (SELECT CAST(max(len(toks)) AS BIGINT) FROM t))) AS k) k
             ON k.k <= len(toks) - 5
         ),
         common AS (SELECT span_text FROM g GROUP BY span_text
                    HAVING count(DISTINCT doc_id) >= 10),
         tot AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans FROM g GROUP BY doc_id),
         com AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_common FROM g
                 WHERE span_text IN (SELECT span_text FROM common) GROUP BY doc_id)
         SELECT doc_id,
           CAST(COALESCE(n_spans, 0) AS BIGINT) AS n_spans,
           CAST(COALESCE(n_common, 0) AS BIGINT) AS n_common,
           CASE WHEN COALESCE(n_spans, 0) > 0
                THEN CAST(COALESCE(n_common, 0) AS DOUBLE) / CAST(n_spans AS DOUBLE) END AS coverage
         FROM documents LEFT JOIN tot USING (doc_id) LEFT JOIN com USING (doc_id)""",
    "q65_seq_pack" ->
      """WITH w AS (
           SELECT doc_id,
             CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS weight
           FROM documents
         ), c AS (
           SELECT doc_id, weight,
             COALESCE(CAST(sum(weight) OVER (ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS cum_before
           FROM w
         )
         SELECT doc_id, weight, cum_before // 1024 AS pack_id FROM c""",
    // The chunk replay is bounded by the corpus's own max chunk count
    // (scalar subquery over the SAME CTE), so a corpus with longer docs
    // can never make the oracle silently under-produce rows — the r5
    // fixed generate_series(0, 2000) cap would have (ADVICE r5).
    "q59_chunk_tokens" ->
      """WITH t AS (
           SELECT doc_id, string_split(trim(text), ' ') AS toks FROM documents
         ), n AS (
           SELECT doc_id, toks,
             CAST(1 + ceil(greatest(len(toks) - 40, 0) / 30.0) AS INT) AS nc
           FROM t
         ), c AS (
           SELECT doc_id, CAST(k.k AS INT) AS chunk_idx,
             toks[k.k * 30 + 1 : k.k * 30 + 40] AS chunk
           FROM n JOIN (SELECT unnest(generate_series(0,
             (SELECT CAST(max(nc) AS BIGINT) FROM n))) AS k) k ON k.k < nc
         )
         SELECT doc_id, chunk_idx, CAST(len(chunk) AS INT) AS n_tokens,
           array_to_string(chunk, ' ') AS chunk_text
         FROM c""",
    "q64_pii_redact" -> {
      import graft.operators.TextOps.{EmailRe, PhoneRe}
      s"""WITH aug AS (
            SELECT doc_id,
              text || ' contact user' || doc_id || '@mail.example.org or 555-' ||
              lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-' ||
              lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS text
            FROM documents
          )
          , de AS (
            SELECT doc_id, text,
              regexp_replace(text, '$EmailRe', '[EMAIL]', 'g') AS de_emailed
            FROM aug
          )
          SELECT doc_id,
            CAST(len(regexp_extract_all(text, '$EmailRe')) AS INT) AS n_emails,
            CAST(len(regexp_extract_all(de_emailed, '$PhoneRe')) AS INT) AS n_phones,
            regexp_replace(de_emailed, '$PhoneRe', '[PHONE]', 'g') AS clean_text
          FROM de"""
    },
    "q70_weighted_mixture" ->
      """WITH w AS (
           SELECT doc_id, lang,
             ('0x' || substring(md5(doc_id::VARCHAR || '#mix'), 1, 15))::BIGINT
               / 1152921504606846976.0 AS u,
             CASE lang WHEN 'en' THEN 2.5 WHEN 'de' THEN 1.0
                       WHEN 'fr' THEN 0.25 ELSE 0.0 END AS wt
           FROM documents
         ), c AS (
           SELECT doc_id, lang,
             CAST(floor(wt) + CASE WHEN u < wt - floor(wt) THEN 1 ELSE 0 END AS INT) AS copies
           FROM w
         )
         SELECT doc_id, lang, CAST(k.k AS INT) AS copy_idx
         FROM c JOIN (SELECT unnest(generate_series(0,
           (SELECT CAST(max(copies) AS BIGINT) FROM c))) AS k) k ON k.k < copies""",
    "q58_hash_split" ->
      """WITH b AS (
           SELECT lang,
             ('0x' || substring(md5(text), 1, 15))::BIGINT % 100 AS bucket
           FROM documents
         )
         SELECT lang,
           CASE WHEN bucket < 80 THEN 'train'
                WHEN bucket < 90 THEN 'valid'
                ELSE 'test' END AS split,
           CAST(count(*) AS BIGINT) AS n
         FROM b GROUP BY 1, 2""",
    "q30_explode_tokens" ->
      """SELECT token, count(*) AS cnt
         FROM (SELECT unnest(string_split(trim(text), ' ')) AS token FROM documents)
         WHERE length(token) > 3
         GROUP BY token ORDER BY cnt DESC, token LIMIT 20""",
    // the BPE merge table is not SQL-replayable, but the round-trip
    // identity is: decode(encode(word)) == word over the exact vocabulary
    "q94a_bpe_roundtrip" ->
      """WITH w AS (
           SELECT DISTINCT unnest(string_split_regex(trim(text), '\s+')) AS word
           FROM documents)
         SELECT word, word AS decoded, CAST(1 AS INT) AS n_subwords_ok
         FROM w WHERE length(word) > 0""",
    "q31_lang_id" ->
      s"""WITH langs AS (
            SELECT * FROM (VALUES $markersSql) AS t(cand, rank, markers)
          ), scored AS (
            SELECT doc_id, lang, cand AS lang_pred,
              len(list_filter(string_split(trim(text), ' '), t -> list_contains(markers, t))) AS hits,
              rank
            FROM documents CROSS JOIN langs
          )
          SELECT doc_id, lang, lang_pred,
            CAST(lang = lang_pred AS INT) AS agree
          FROM scored
          QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY hits DESC, rank) = 1""",
    "q32_text_quality" ->
      s"""WITH f AS (
            SELECT doc_id,
              len(string_split(trim(text), ' ')) AS n_tokens,
              length(text) AS len_chars,
              len(list_filter(string_split(trim(text), ' '), t -> t IN ($stopSql))) AS n_stop,
              length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) AS n_punct
            FROM documents
          )
          SELECT doc_id, n_tokens, len_chars, n_stop, n_punct,
            ((CASE WHEN len_chars >= 100 AND len_chars <= 20000 THEN 1.0 ELSE 0.0 END)
            + (CASE WHEN CAST(n_stop AS DOUBLE)/CAST(n_tokens AS DOUBLE) > 0.01 THEN 1.0 ELSE 0.0 END)
            + (CASE WHEN CAST(n_punct AS DOUBLE)/CAST(len_chars AS DOUBLE) < 0.1 THEN 1.0 ELSE 0.0 END)
            + (CASE WHEN CAST(len_chars AS DOUBLE)/CAST(n_tokens AS DOUBLE) >= 2.0
                     AND CAST(len_chars AS DOUBLE)/CAST(n_tokens AS DOUBLE) <= 12.0 THEN 1.0 ELSE 0.0 END))
            * 0.25 AS quality
          FROM f""",
    "q33_token_count" ->
      """SELECT lang, count(*) AS n_docs,
         CAST(sum(len(string_split(trim(text), ' '))) AS BIGINT) AS ws_tokens,
         CAST(sum(len(regexp_extract_all(text, '[A-Za-z]{1,4}|[0-9]+|[^A-Za-z0-9\s]'))) AS BIGINT) AS subword_tokens
         FROM documents GROUP BY lang""",
    "q34_fingerprint" ->
      """SELECT doc_id,
         list_reduce(
           list_prepend(CAST(0 AS BIGINT),
             list_transform(string_split(trim(text), ' '),
               t -> ('0x' || substring(md5(t), 1, 15))::BIGINT % 1000003)),
           (acc, x) -> (acc * 131 + x) % 2147483647) AS fp
         FROM documents""")
}
