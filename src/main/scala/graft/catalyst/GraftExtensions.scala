package graft.catalyst

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StringType

/** Session extension wiring (`spark.sql.extensions=graft.catalyst.
  * GraftExtensions` or `builder.withExtensions(new GraftExtensions)`):
  *
  *  1. registers every graft Catalyst expression as a SQL function, so the
  *     browse/continuous SQL surface (`SqlProcessors`) reaches the custom
  *     kernels without the Column API — `SELECT simhash64(split(text,' '))
  *     FROM docs` works in plain SQL;
  *  2. injects [[UnitVecIdempotence]], collapsing repeated normalization
  *     (`unit_vec(unit_vec(x)) → unit_vec(x)`) so composed similarity
  *     pipelines don't renormalize per stage.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def litStr(e: Expression, what: String): String = e match {
    case Literal(v, StringType) if v != null => v.toString
    case other => throw new IllegalArgumentException(
      s"$what must be a string literal, got $other")
  }

  private def litDouble(e: Expression, what: String): Double = e match {
    case Literal(v: Double, _) => v
    // SQL decimal literals (e.g. 0.3) arrive as o.a.s.sql.types.Decimal
    case Literal(v, _) if v != null && e.dataType.isInstanceOf[org.apache.spark.sql.types.DecimalType] =>
      v.asInstanceOf[org.apache.spark.sql.types.Decimal].toDouble
    case Literal(v: Int, _) => v.toDouble
    case Literal(v: Long, _) => v.toDouble
    case other => throw new IllegalArgumentException(
      s"$what must be a numeric literal, got $other")
  }

  /** Comma-separated column list; each entry may carry a trailing
    * ASC/DESC (for ordering positions). */
  private def colList(spec: String): Seq[String] =
    spec.split(",").map(_.trim).filter(_.nonEmpty).toSeq

  private def orderCols(spec: String): Seq[Column] =
    colList(spec).map { s =>
      val lower = s.toLowerCase
      if (lower.endsWith(" desc")) col(s.dropRight(5).trim).desc
      else if (lower.endsWith(" asc")) col(s.dropRight(4).trim).asc
      else col(s)
    }

  private def litInt(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case Literal(v: Long, _) => v.toInt
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  private def litLong(e: Expression, what: String): Long = e match {
    case Literal(v: Int, _) => v.toLong
    case Literal(v: Long, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    // minArgs/maxArgs: silently dropping extra args (or surfacing a bare
    // IndexOutOfBounds on missing ones) would hide user errors — reject
    // wrong arity with the function's own name and usage string.
    def register(name: String, usage: String, minArgs: Int, maxArgs: Int)(
        builder: Seq[Expression] => Expression): Unit =
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft.catalyst.GraftExtensions", null, name, usage, ""),
        exprs => {
          if (exprs.length < minArgs || exprs.length > maxArgs)
            throw new IllegalArgumentException(
              s"$name expects ${if (minArgs == maxArgs) s"$minArgs" else s"$minArgs to $maxArgs"}" +
                s" argument(s), got ${exprs.length}; usage: $usage")
          builder(exprs)
        }))

    register("simhash64", "simhash64(tokens) - 64-bit SimHash of a string array", 1, 1) {
      exprs => SimHash64(exprs.head)
    }
    register("dot_d", "dot_d(a, b) - dot product of two double arrays", 2, 2) {
      exprs => DotProductD(exprs(0), exprs(1))
    }
    register("unit_vec", "unit_vec(v) - L2-normalize a float/double array to unit double array", 1, 1) {
      exprs => UnitVector(exprs.head)
    }
    register("hyperplane_sketch",
      "hyperplane_sketch(v, nBits[, seed]) - signed random-hyperplane LSH sketch", 2, 3) {
      exprs => HyperplaneSketch64(exprs.head, litInt(exprs(1), "nBits"),
        if (exprs.length > 2) litLong(exprs(2), "seed") else 42L)
    }
    register("shingle_hashes",
      "shingle_hashes(tokens, n) - sorted distinct 64-bit hashes of word n-gram shingles", 2, 2) {
      exprs => ShingleHashes(exprs.head, litInt(exprs(1), "n"))
    }
    register("minhash_sig",
      "minhash_sig(shingleHashes, numPerms[, seed]) - MinHash signature array", 2, 3) {
      exprs => MinHashSig(exprs.head, litInt(exprs(1), "numPerms"),
        if (exprs.length > 2) litLong(exprs(2), "seed") else 42L)
    }
    register("intersect_count_sorted",
      "intersect_count_sorted(a, b) - |A∩B| of two sorted distinct long arrays", 2, 2) {
      exprs => IntersectCountSorted(exprs(0), exprs(1))
    }

    // Text-analysis surface as SQL macros: these are Column compositions,
    // registered by expanding their expression trees — a SQL user gets
    // `SELECT lang_id(text), quality_score(text) FROM docs` with the
    // exact semantics of the oracle-checked column API (q31-q34).
    def registerComposed(name: String, usage: String)(f: org.apache.spark.sql.Column => org.apache.spark.sql.Column): Unit =
      register(name, usage, 1, 1)(exprs =>
        // eager conversion: the builder must hand the analyzer a plain
        // catalyst tree, not a lazy Column-node wrapper (see GraftBridge)
        org.apache.spark.sql.GraftBridge.expressionEager(f(Cols.column(exprs.head))))
    import graft.functions.TextFunctions
    registerComposed("graft_tokens", "graft_tokens(text) - whitespace tokens")(TextFunctions.tokens)
    registerComposed("token_count", "token_count(text) - whitespace token count")(TextFunctions.tokenCount)
    registerComposed("subword_count", "subword_count(text) - BPE-ish subword unit count")(TextFunctions.subwordCount)
    registerComposed("quality_score", "quality_score(text) - 4-heuristic quality score in [0,1]")(TextFunctions.qualityScore)
    registerComposed("lang_id", "lang_id(text) - n-gram/stopword language guess")(TextFunctions.langId)
    registerComposed("doc_fingerprint", "doc_fingerprint(text) - rolling polynomial hash")(TextFunctions.fingerprint)
    register("token_f1_micro",
      "token_f1_micro(a, b) - per-row token-level F1 (micro-units): unigram " +
        "multiset overlap of the two strings, (2e6*m) div (|a|+|b|)", 2, 2) { exprs =>
      org.apache.spark.sql.GraftBridge.expressionEager(
        TextFunctions.tokenF1Micro(Cols.column(exprs(0)), Cols.column(exprs(1))))
    }
    register("haversine_m",
      "haversine_m(lat1, lon1, lat2, lon2) - great-circle distance in meters", 4, 4) { exprs =>
      org.apache.spark.sql.GraftBridge.expressionEager(
        graft.functions.GeoFunctions.haversineMeters(
          Cols.column(exprs(0)), Cols.column(exprs(1)),
          Cols.column(exprs(2)), Cols.column(exprs(3))))
    }
    register("parse_lat_lon",
      "parse_lat_lon(s) - parse 'lat,lon' string to struct<lat:double,lon:double>", 1, 1) { exprs =>
      org.apache.spark.sql.GraftBridge.expressionEager(
        graft.functions.GeoFunctions.parseLatLon(Cols.column(exprs.head)))
    }

    // ---- Table-valued functions: the workhorse OPERATORS for plain-SQL
    // users (the reference's actual audience). Each TVF macro-expands at
    // resolution time: the named view is resolved through the active
    // session, the DataFrame-level operator builds its full logical plan,
    // and that analyzed subtree is spliced into the outer query — so SQL
    // callers get the IDENTICAL oracle-checked plan as the Column API
    // (same shuffle shape, same broadcast decisions), not a re-
    // implementation. Works over streaming views too: streaming-ness of
    // the source plan is preserved, so `INSERT INTO … SELECT … FROM
    // latest_by_key(...)` runs continuously (SqlProcessorsSpec).
    val tvfCatalog = scala.collection.mutable.ArrayBuffer[(String, String)]()
    def registerTable(name: String, usage: String, nArgs: Int)(
        builder: Seq[Expression] => LogicalPlan): Unit = {
      tvfCatalog += ((name, usage))
      ext.injectTableFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft.catalyst.GraftExtensions", null, name, usage, ""),
        exprs => {
          if (exprs.length != nArgs)
            throw new IllegalArgumentException(
              s"$name expects $nArgs argument(s), got ${exprs.length}; usage: $usage")
          builder(exprs)
        }))
    }
    def expand(df: org.apache.spark.sql.DataFrame): LogicalPlan = df.queryExecution.analyzed

    registerTable("latest_by_key",
      "latest_by_key('table', 'k1,k2', 'ordCol1,ordCol2') - one latest row per key (compaction)", 3) {
      exprs =>
        val t = SparkSession.active.table(litStr(exprs(0), "table"))
        val ordering = colList(litStr(exprs(2), "ordering"))
        // the ordering is a max_by VALUE tuple, not a sort spec — a
        // trailing DESC (valid in top_k_per_group) would silently become
        // a bogus column name, so reject it with the actual alternative
        ordering.filter(_.toLowerCase.matches(".*\\s(asc|desc)$")).foreach { o =>
          throw new IllegalArgumentException(
            s"latest_by_key ordering takes plain columns (row with MAX ordering tuple wins), " +
              s"got '$o'; for custom sort direction use top_k_per_group(..., k=1)")
        }
        expand(graft.operators.Relational.latestByKey(t,
          colList(litStr(exprs(1), "keys")), ordering.map(col)))
    }
    registerTable("top_k_per_group",
      "top_k_per_group('table', 'g1,g2', 'ord1 DESC,ord2', k) - k best rows per group", 4) {
      exprs =>
        val t = SparkSession.active.table(litStr(exprs(0), "table"))
        expand(graft.operators.Relational.topKPerGroup(t,
          colList(litStr(exprs(1), "groups")).map(col),
          orderCols(litStr(exprs(2), "ordering")),
          litInt(exprs(3), "k")))
    }
    registerTable("interval_join",
      "interval_join('left', 'leftTs', 'right', 'rightTs', 'leftKey', 'rightKey', 'max delay') " +
        "- equi-key join where right.ts is within +/- delay of left.ts", 7) {
      exprs =>
        val l = SparkSession.active.table(litStr(exprs(0), "left table"))
        val r = SparkSession.active.table(litStr(exprs(2), "right table"))
        expand(graft.operators.Relational.intervalJoin(
          l, litStr(exprs(1), "left ts"), r, litStr(exprs(3), "right ts"),
          l(litStr(exprs(4), "left key")) === r(litStr(exprs(5), "right key")),
          litStr(exprs(6), "max delay")))
    }
    registerTable("asof_join",
      "asof_join('left', 'right', 'leftKey', 'rightKey', 'leftTs', 'rightTs') " +
        "- left columns + `_asof` struct of the latest right row at-or-before each left time", 6) {
      exprs =>
        val l = SparkSession.active.table(litStr(exprs(0), "left table"))
        val r = SparkSession.active.table(litStr(exprs(1), "right table"))
        expand(graft.operators.Relational.asofJoinBackward(l, r,
          litStr(exprs(2), "left key"), litStr(exprs(3), "right key"),
          litStr(exprs(4), "left ts"), litStr(exprs(5), "right ts")))
    }
    registerTable("asof_join_tolerance",
      "asof_join_tolerance('left', 'right', 'leftKey', 'rightKey', 'leftTs', 'rightTs', " +
        "'tolerance') - asof_join whose match nulls out when older than " +
        "leftTs - tolerance (pandas merge_asof semantics)", 7) {
      exprs =>
        val l = SparkSession.active.table(litStr(exprs(0), "left table"))
        val r = SparkSession.active.table(litStr(exprs(1), "right table"))
        expand(graft.operators.Relational.asofJoinBackward(l, r,
          litStr(exprs(2), "left key"), litStr(exprs(3), "right key"),
          litStr(exprs(4), "left ts"), litStr(exprs(5), "right ts"),
          tolerance = Some(litStr(exprs(6), "tolerance interval"))))
    }
    registerTable("asof_join_forward",
      "asof_join_forward('left', 'right', 'leftKey', 'rightKey', 'leftTs', 'rightTs') " +
        "- left columns + `_asof` struct of the EARLIEST right row at-or-after each left time", 6) {
      exprs =>
        val l = SparkSession.active.table(litStr(exprs(0), "left table"))
        val r = SparkSession.active.table(litStr(exprs(1), "right table"))
        expand(graft.operators.Relational.asofJoinForward(l, r,
          litStr(exprs(2), "left key"), litStr(exprs(3), "right key"),
          litStr(exprs(4), "left ts"), litStr(exprs(5), "right ts")))
    }
    registerTable("neardup_pairs",
      "neardup_pairs('table', 'idCol', 'textCol', n, minJaccard) - exact n-gram Jaccard pairs", 5) {
      exprs =>
        val t = SparkSession.active.table(litStr(exprs(0), "table"))
        expand(graft.operators.Dedup.ngramJaccardPairs(t,
          litStr(exprs(1), "id column"), litStr(exprs(2), "text column"),
          litInt(exprs(3), "n"), litDouble(exprs(4), "minJaccard")))
    }
    registerTable("minhash_pairs",
      "minhash_pairs('table', 'idCol', 'textCol', n, minJaccard) - MinHash+LSH candidate pairs, verified", 5) {
      exprs =>
        val t = SparkSession.active.table(litStr(exprs(0), "table"))
        expand(graft.operators.Dedup.minhashLshPairs(t,
          litStr(exprs(1), "id column"), litStr(exprs(2), "text column"),
          litInt(exprs(3), "n"), litDouble(exprs(4), "minJaccard")))
    }

    registerTable("chunk_tokens",
      "chunk_tokens('table', 'idCol', 'textCol', window, overlap) - overlapping token windows", 5) {
      exprs =>
        val t = SparkSession.active.table(litStr(exprs(0), "table"))
        expand(graft.operators.TextOps.chunkTokens(t,
          litStr(exprs(1), "id column"), litStr(exprs(2), "text column"),
          litInt(exprs(3), "window"), litInt(exprs(4), "overlap")))
    }
    registerTable("redact_pii",
      "redact_pii('table', 'idCol', 'textCol') - scrub emails/phones, with counts", 3) {
      exprs =>
        val t = SparkSession.active.table(litStr(exprs(0), "table"))
        expand(graft.operators.TextOps.redactPii(t,
          litStr(exprs(1), "id column"), litStr(exprs(2), "text column")))
    }
    registerTable("rep_stats",
      "rep_stats('table', 'idCol', 'textCol', n) - per-doc n-gram repetition quality stats", 4) {
      exprs =>
        val t = SparkSession.active.table(litStr(exprs(0), "table"))
        expand(graft.operators.TextOps.repetitionStats(t,
          litStr(exprs(1), "id column"), litStr(exprs(2), "text column"),
          litInt(exprs(3), "n")))
    }
    registerTable("bm25_search",
      "bm25_search('table', 'idCol', 'textCol', 'term1,term2', k) - top-k docs by BM25", 5) {
      exprs =>
        val t = SparkSession.active.table(litStr(exprs(0), "table"))
        expand(graft.operators.TextOps.bm25Search(t,
          litStr(exprs(1), "id column"), litStr(exprs(2), "text column"),
          colList(litStr(exprs(3), "query terms")), litInt(exprs(4), "k")))
    }
    registerTable("repeated_spans",
      "repeated_spans('table', 'idCol', 'textCol', span, minDocs) - corpus-common token spans", 5) {
      exprs =>
        val t = SparkSession.active.table(litStr(exprs(0), "table"))
        expand(graft.operators.TextOps.repeatedSpans(t,
          litStr(exprs(1), "id column"), litStr(exprs(2), "text column"),
          litInt(exprs(3), "span"), litInt(exprs(4), "minDocs")))
    }
    registerTable("normalize_text",
      "normalize_text('table', 'textCol') - lowercase, strip punctuation, collapse whitespace", 2) {
      exprs =>
        val t = SparkSession.active.table(litStr(exprs(0), "table"))
        expand(graft.operators.TextOps.normalizeText(t, litStr(exprs(1), "text column")))
    }
    registerTable("html_to_text",
      "html_to_text('table', 'textCol') - strip script/style/comments/tags, " +
        "decode entities, collapse whitespace (crawl extraction)", 2) {
      exprs =>
        val t = SparkSession.active.table(litStr(exprs(0), "table"))
        expand(graft.operators.TextOps.htmlToText(t, litStr(exprs(1), "text column")))
    }
    registerTable("split_sentences",
      "split_sentences('table', 'idCol', 'textCol') - one row per " +
        "terminator-delimited sentence with index and char count", 3) {
      exprs =>
        val t = SparkSession.active.table(litStr(exprs(0), "table"))
        expand(graft.operators.TextOps.splitSentences(t,
          litStr(exprs(1), "id column"), litStr(exprs(2), "text column")))
    }
    registerTable("sentence_chunks",
      "sentence_chunks('table', 'idCol', 'textCol', budget) - greedy " +
        "whole-sentence chunks of ~budget tokens (never splits a sentence)", 4) {
      exprs =>
        val t = SparkSession.active.table(litStr(exprs(0), "table"))
        expand(graft.operators.TextOps.sentenceChunks(t,
          litStr(exprs(1), "id column"), litStr(exprs(2), "text column"),
          litLong(exprs(3), "budget")))
    }
    registerTable("dedup_sentences",
      "dedup_sentences('table', 'idCol', 'textCol') - corpus-wide exact " +
        "sentence dedup: keep each sentence at its first (doc, idx) " +
        "occurrence, reassemble docs from survivors", 3) {
      exprs =>
        val t = SparkSession.active.table(litStr(exprs(0), "table"))
        expand(graft.operators.TextOps.dedupSentences(t,
          litStr(exprs(1), "id column"), litStr(exprs(2), "text column")))
    }
    registerTable("epoch_shuffle",
      "epoch_shuffle('table', 'keyCol', epochs, nShards) - deterministic " +
        "per-epoch (shard, pos) read addresses for a training loader", 4) {
      exprs =>
        val t = SparkSession.active.table(litStr(exprs(0), "table"))
        expand(graft.operators.Relational.epochShuffle(t,
          litStr(exprs(1), "key column"), litInt(exprs(2), "epochs"),
          litInt(exprs(3), "nShards")))
    }
    registerTable("fuzzy_join",
      "fuzzy_join('left', 'right', 'lblock', 'rblock', 'ltext', 'rtext', maxDist) - " +
        "blocked record linkage by edit distance", 7) {
      exprs =>
        val l = SparkSession.active.table(litStr(exprs(0), "left table"))
        val r = SparkSession.active.table(litStr(exprs(1), "right table"))
        expand(graft.operators.Relational.fuzzyJoin(l, r,
          Seq(litStr(exprs(2), "left block key") -> litStr(exprs(3), "right block key")),
          litStr(exprs(4), "left text"), litStr(exprs(5), "right text"),
          litInt(exprs(6), "maxDist")))
    }
    registerTable("apply_changes",
      "apply_changes('snapshot', 'changes', 'key', 'opCol', 'seqCol') - MERGE a " +
        "CDC changelog into a snapshot: latest change per key wins, 'delete' " +
        "removes, any other op upserts", 5) {
      exprs =>
        expand(graft.operators.Relational.applyChanges(
          SparkSession.active.table(litStr(exprs(0), "snapshot table")),
          SparkSession.active.table(litStr(exprs(1), "changes table")),
          Seq(litStr(exprs(2), "key column")),
          litStr(exprs(3), "op column"), litStr(exprs(4), "seq column")))
    }
    registerTable("period_over_period",
      "period_over_period('table', 'keyCol', 'tsCol', 'valueCol', periodDays) - " +
        "per-(key, fixed UTC period) totals with the adjacent previous period " +
        "and exact ppm growth (gaps yield NULL prev)", 5) {
      exprs =>
        expand(graft.operators.Events.periodOverPeriod(
          SparkSession.active.table(litStr(exprs(0), "table")),
          litStr(exprs(1), "key column"), litStr(exprs(2), "ts column"),
          litStr(exprs(3), "value column"), litInt(exprs(4), "periodDays")))
    }
    registerTable("pareto_classes",
      "pareto_classes('table', 'keyCol', 'valueCol', 'A:70,B:90,C:100') - ABC " +
        "segmentation by descending cumulative share (distributed prefix sum, " +
        "exact integer cuts)", 4) {
      exprs =>
        val cuts = colList(litStr(exprs(3), "cuts")).map { entry =>
          entry.split(":") match {
            case Array(name, pct) if pct.trim.nonEmpty && pct.trim.forall(_.isDigit) =>
              name.trim -> pct.trim.toInt
            case _ => throw new IllegalArgumentException(
              s"pareto_classes entry '$entry' must be 'name:cumulativePct'")
          }
        }
        expand(graft.operators.Relational.paretoClasses(
          SparkSession.active.table(litStr(exprs(0), "table")),
          litStr(exprs(1), "key column"), litStr(exprs(2), "value column"), cuts))
    }
    registerTable("concurrency_sweep",
      "concurrency_sweep('table', 'startCol', 'endCol') - active-interval count " +
        "at every change instant over half-open [start, end) intervals " +
        "(distributed prefix sum, never a one-partition window). NULL " +
        "start/end fails loudly; still-open intervals (NULL end) either " +
        "pre-filter or use concurrency_sweep_open to clamp to a horizon", 3) {
      exprs =>
        expand(graft.operators.Events.concurrencySweep(
          SparkSession.active.table(litStr(exprs(0), "table")),
          litStr(exprs(1), "start column"), litStr(exprs(2), "end column")))
    }
    registerTable("concurrency_sweep_open",
      "concurrency_sweep_open('table', 'startCol', 'endCol', 'horizonTs') - " +
        "concurrency_sweep with still-open intervals (NULL end) clamped to " +
        "the horizon timestamp (open intervals count as active through the " +
        "horizon); NULL start still fails loudly", 4) {
      exprs =>
        expand(graft.operators.Events.concurrencySweep(
          SparkSession.active.table(litStr(exprs(0), "table")),
          litStr(exprs(1), "start column"), litStr(exprs(2), "end column"),
          openEndAt = Some(org.apache.spark.sql.functions.to_timestamp(
            org.apache.spark.sql.functions.lit(
              litStr(exprs(3), "horizon timestamp"))))))
    }
    registerTable("cooccurrence",
      "cooccurrence('table', 'groupCol', 'itemCol', minGroups) - unordered item " +
        "pairs by number of groups containing both (co-presence; a < b). A " +
        "mega-group costs items^2 pairs: profile with key_skew_profile first, " +
        "or use cooccurrence_capped to refuse oversized groups loudly", 4) {
      exprs =>
        expand(graft.operators.Events.coOccurrence(
          SparkSession.active.table(litStr(exprs(0), "table")),
          litStr(exprs(1), "group column"), litStr(exprs(2), "item column"),
          litLong(exprs(3), "minGroups")))
    }
    registerTable("association_rules",
      "association_rules('table', 'groupCol', 'itemCol', minGroups) - directed " +
        "(antecedent -> consequent) rules with exact integer confidence_ppm and " +
        "lift_ppm over group/item co-presence; same mega-group caveat as " +
        "cooccurrence", 4) {
      exprs =>
        expand(graft.operators.Events.associationRules(
          SparkSession.active.table(litStr(exprs(0), "table")),
          litStr(exprs(1), "group column"), litStr(exprs(2), "item column"),
          litLong(exprs(3), "minGroups")))
    }
    registerTable("cusum",
      "cusum('table', 'keyCol', 'tsCol', 'valueCol', target, slack, threshold, " +
        "'tiebreakCol') - one-sided CUSUM upward-drift statistic and is_change " +
        "flag per key in time order (Page's test, exact integer units)", 8) {
      exprs =>
        expand(graft.operators.Events.cusumChangepoints(
          SparkSession.active.table(litStr(exprs(0), "table")),
          litStr(exprs(1), "key column"), litStr(exprs(2), "ts column"),
          litStr(exprs(3), "value column"),
          litLong(exprs(4), "target"), litLong(exprs(5), "slack"),
          litLong(exprs(6), "threshold"),
          Seq(org.apache.spark.sql.functions.col(litStr(exprs(7), "tiebreak column")))))
    }
    registerTable("cooccurrence_capped",
      "cooccurrence_capped('table', 'groupCol', 'itemCol', minGroups, maxItems) - " +
        "cooccurrence that FAILS (naming the group) when any group holds more " +
        "than maxItems distinct items — the guard for pipelines that would " +
        "rather refuse a mega-group's items^2 blowup than pay it; see " +
        "key_skew_profile", 5) {
      exprs =>
        expand(graft.operators.Events.coOccurrence(
          SparkSession.active.table(litStr(exprs(0), "table")),
          litStr(exprs(1), "group column"), litStr(exprs(2), "item column"),
          litLong(exprs(3), "minGroups"), litLong(exprs(4), "maxItems")))
    }
    registerTable("transitions",
      "transitions('table', 'keyCol', 'tsCol', 'typeCol', 'tiebreakCol') - " +
        "first-order Markov transition counts over per-key event order", 5) {
      exprs =>
        expand(graft.operators.Events.transitionMatrix(
          SparkSession.active.table(litStr(exprs(0), "table")),
          litStr(exprs(1), "key column"), litStr(exprs(2), "ts column"),
          litStr(exprs(3), "type column"),
          Seq(org.apache.spark.sql.functions.col(litStr(exprs(4), "tiebreak column")))))
    }
    registerTable("expectations",
      "expectations('table', 'name1:sqlExpr1;name2:sqlExpr2', 'uniqueKeyCols') - " +
        "data-contract report: violation counts per rule in one pass + a " +
        "duplicate-key row ('' = no uniqueness check)", 3) {
      exprs =>
        val rules = litStr(exprs(1), "rules ('name:expr;...')").split(";")
          .map(_.trim).filter(_.nonEmpty).toSeq.map { entry =>
            entry.split(":", 2) match {
              case Array(name, sql) if sql.trim.nonEmpty =>
                name.trim -> org.apache.spark.sql.functions.expr(sql.trim)
              case _ => throw new IllegalArgumentException(
                s"expectations entry '$entry' must be 'name:sqlExpr'")
            }
          }
        val uk = litStr(exprs(2), "unique key columns ('' = none)")
        expand(graft.operators.Relational.expectationReport(
          SparkSession.active.table(litStr(exprs(0), "table")), rules,
          if (uk.trim.isEmpty) Nil else colList(uk)))
    }
    registerTable("anomalies",
      "anomalies('table', 'keyCol', 'tsCol', 'valueCol', 'window', z2centi, minPrior) - " +
        "exact integer z-score flags vs the strictly-earlier trailing window " +
        "(z2centi = z-squared x 100; 900 = 3 sigma)", 7) {
      exprs =>
        expand(graft.operators.Events.anomalies(
          SparkSession.active.table(litStr(exprs(0), "table")),
          litStr(exprs(1), "key column"), litStr(exprs(2), "ts column"),
          litStr(exprs(3), "value column"), litStr(exprs(4), "window interval"),
          litLong(exprs(5), "z2centi"), litInt(exprs(6), "minPrior")))
    }
    registerTable("calibration_curve",
      "calibration_curve('scored', 'idCol', 'predCol', 'scoreCol', 'truth', " +
        "'truthIdCol', 'truthLabelCol', nBins) - classifier reliability diagram: " +
        "equal-width score bins with exact integer-micro accuracy", 8) {
      exprs =>
        expand(graft.operators.TextOps.calibrationCurve(
          SparkSession.active.table(litStr(exprs(0), "scored table")),
          litStr(exprs(1), "id column"), litStr(exprs(2), "pred column"),
          litStr(exprs(3), "score column"),
          SparkSession.active.table(litStr(exprs(4), "truth table")),
          litStr(exprs(5), "truth id column"), litStr(exprs(6), "truth label column"),
          litInt(exprs(7), "nBins")))
    }
    registerTable("key_skew",
      "key_skew('table', 'col1,col2', topK) - pre-shuffle skew diagnostic: top-k " +
        "hottest keys + order-of-magnitude (decimal-digit) count histogram", 3) {
      exprs =>
        expand(graft.operators.Relational.keySkewProfile(
          SparkSession.active.table(litStr(exprs(0), "table")),
          colList(litStr(exprs(1), "key columns")), litInt(exprs(2), "topK")))
    }
    registerTable("scd2",
      "scd2('changes', 'keyCol', 'opCol', 'seqCol', 'tsCol') - type-2 SCD from a " +
        "changelog: per-version validity intervals; deletes close the prior " +
        "version and emit nothing", 5) {
      exprs =>
        expand(graft.operators.Relational.scd2(
          SparkSession.active.table(litStr(exprs(0), "changes table")),
          Seq(litStr(exprs(1), "key column")), litStr(exprs(2), "op column"),
          litStr(exprs(3), "seq column"), litStr(exprs(4), "ts column")))
    }
    registerTable("range_join",
      "range_join('left', 'valueCol', 'right', 'loCol', 'hiCol', bucketWidth) - " +
        "bucketized numeric range join on lo <= value < hi (equi-join on width-W " +
        "buckets, never a nested-loop join)", 6) {
      exprs =>
        expand(graft.operators.Relational.rangeJoin(
          SparkSession.active.table(litStr(exprs(0), "left table")),
          litStr(exprs(1), "value column"),
          SparkSession.active.table(litStr(exprs(2), "right table")),
          litStr(exprs(3), "lo column"), litStr(exprs(4), "hi column"),
          litLong(exprs(5), "bucketWidth")))
    }
    registerTable("rolling_agg",
      "rolling_agg('table', 'keyCol', 'tsCol', 'valueCol', 'window') - trailing " +
        "time-RANGE sum/count per event (equal timestamps are peers); valueCol " +
        "must be integral", 5) {
      exprs =>
        expand(graft.operators.Events.rollingAgg(
          SparkSession.active.table(litStr(exprs(0), "table")),
          litStr(exprs(1), "key column"), litStr(exprs(2), "ts column"),
          litStr(exprs(3), "value column"), litStr(exprs(4), "window interval")))
    }
    registerTable("length_batches",
      "length_batches('table', 'idCol', 'tokensCol', 'edge1,edge2,...', batchSize) - " +
        "group rows into fixed-size batches of similar length (upper-exclusive " +
        "bands; overflow band past the last edge); deterministic hash order", 5) {
      exprs =>
        val edges = colList(litStr(exprs(3), "bucket edges")).map { e =>
          require(e.forall(_.isDigit), s"bucket edge '$e' must be a non-negative integer")
          e.toLong
        }
        expand(graft.operators.TextOps.lengthBucketBatches(
          SparkSession.active.table(litStr(exprs(0), "table")),
          litStr(exprs(1), "id column"), litStr(exprs(2), "tokens column"),
          edges, litInt(exprs(4), "batchSize")))
    }
    registerTable("triangle_stats",
      "triangle_stats('edgesTable', 'srcCol', 'dstCol') - per-node triangle " +
        "count and local clustering coefficient (micro-units); directions and " +
        "multi-edges collapse, degree-ordered orientation", 3) {
      exprs =>
        expand(graft.operators.Graph.triangleStats(
          SparkSession.active.table(litStr(exprs(0), "edges table")),
          litStr(exprs(1), "src column"), litStr(exprs(2), "dst column")))
    }
    registerTable("sessionize",
      "sessionize('table', 'keyCol', 'tsCol', 'gap', 'tiebreakCol') - label every " +
        "event with its per-key session sequence (new session when the gap is " +
        "exceeded; events exactly gap apart merge)", 5) {
      exprs =>
        expand(graft.operators.Events.sessionize(
          SparkSession.active.table(litStr(exprs(0), "table")),
          litStr(exprs(1), "key column"), litStr(exprs(2), "ts column"),
          litStr(exprs(3), "gap interval"),
          Seq(org.apache.spark.sql.functions.col(litStr(exprs(4), "tiebreak column")))))
    }
    registerTable("funnel",
      "funnel('table', 'keyCol', 'tsCol', 'typeCol', 'step1,step2,...', 'horizon') - " +
        "per-key earliest completion time of each ordered step ('' horizon = " +
        "unbounded); later steps strictly after earlier, horizon from step 1", 6) {
      exprs =>
        val h = litStr(exprs(5), "horizon interval ('' = none)")
        expand(graft.operators.Events.funnelSteps(
          SparkSession.active.table(litStr(exprs(0), "table")),
          litStr(exprs(1), "key column"), litStr(exprs(2), "ts column"),
          litStr(exprs(3), "type column"),
          colList(litStr(exprs(4), "steps")),
          if (h.trim.isEmpty) None else Some(h)))
    }
    registerTable("funnel_all",
      "funnel_all('table', 'keyCol', 'tsCol', 'typeCol', 'step1,step2,...', 'horizon') - " +
        "funnel over the WHOLE key universe (BI convention): never-started " +
        "keys appear with null step times and furthest_step 0", 6) {
      exprs =>
        val h = litStr(exprs(5), "horizon interval ('' = none)")
        expand(graft.operators.Events.funnelSteps(
          SparkSession.active.table(litStr(exprs(0), "table")),
          litStr(exprs(1), "key column"), litStr(exprs(2), "ts column"),
          litStr(exprs(3), "type column"),
          colList(litStr(exprs(4), "steps")),
          if (h.trim.isEmpty) None else Some(h),
          emitAllKeys = true))
    }
    registerTable("retention_cohorts",
      "retention_cohorts('table', 'keyCol', 'tsCol', periodDays) - cohort by " +
        "first-activity period, distinct active keys per (cohort, offset)", 4) {
      exprs =>
        expand(graft.operators.Events.retentionCohorts(
          SparkSession.active.table(litStr(exprs(0), "table")),
          litStr(exprs(1), "key column"), litStr(exprs(2), "ts column"),
          litInt(exprs(3), "periodDays")))
    }
    registerTable("gap_fill",
      "gap_fill('table', 'keyCol', 'tsCol', 'valueCol', 'step') - resample each " +
        "key's series onto the step grid: observed slots aggregate exactly, gaps " +
        "carry LOCF/NOCB and the exact integer-lerp interp_micro", 5) {
      exprs =>
        expand(graft.operators.Events.gapFill(
          SparkSession.active.table(litStr(exprs(0), "table")),
          litStr(exprs(1), "key column"), litStr(exprs(2), "ts column"),
          litStr(exprs(3), "value column"), litStr(exprs(4), "step interval")))
    }
    registerTable("gap_fill_capped",
      "gap_fill_capped('table', 'keyCol', 'tsCol', 'valueCol', 'step', maxSlots) - " +
        "gap_fill that FAILS (naming the key) when any key spans more than " +
        "maxSlots grid slots — the guard for span-runaway series; coarsen step " +
        "or split the series instead of landing a multi-hundred-k-row task", 6) {
      exprs =>
        expand(graft.operators.Events.gapFill(
          SparkSession.active.table(litStr(exprs(0), "table")),
          litStr(exprs(1), "key column"), litStr(exprs(2), "ts column"),
          litStr(exprs(3), "value column"), litStr(exprs(4), "step interval"),
          maxSlotsPerKey = litLong(exprs(5), "maxSlots")))
    }
    registerTable("normalize_unicode",
      "normalize_unicode('table', 'textCol') - NFC compose (UAX #15), lowercase, " +
        "strip non-letter/digit of any script, collapse whitespace", 2) {
      exprs =>
        val t = SparkSession.active.table(litStr(exprs(0), "table"))
        expand(graft.operators.TextOps.normalizeText(t,
          litStr(exprs(1), "text column"), unicode = true))
    }
    registerTable("quota_sample",
      "quota_sample('table', 'stratumCol', 'idCol', k) - deterministic per-stratum " +
        "quota sample under the md5 content-hash order (bounded-state top-k agg)", 4) {
      exprs =>
        val t = SparkSession.active.table(litStr(exprs(0), "table"))
        expand(graft.operators.Relational.quotaSampleByHash(t,
          litStr(exprs(1), "stratum column"), litStr(exprs(2), "id column"),
          litInt(exprs(3), "k")))
    }
    registerTable("bm25_batch",
      "bm25_batch('docs', 'idCol', 'textCol', 'termsTable', 'termCol', k) - " +
        "BM25 top-k against a TABLE of query terms (the 10k-term sweep shape)", 6) {
      exprs =>
        val t = SparkSession.active.table(litStr(exprs(0), "docs table"))
        val terms = SparkSession.active.table(litStr(exprs(3), "terms table"))
        expand(graft.operators.TextOps.bm25ScoreBatch(t,
          litStr(exprs(1), "id column"), litStr(exprs(2), "text column"),
          terms, litStr(exprs(4), "term column"), litInt(exprs(5), "k")))
    }
    registerTable("url_blocklist",
      "url_blocklist('table', 'idCol', 'textCol', 'domain1,domain2') - per-doc URL " +
        "counts + keep verdict against a blocked-domain list (subdomains included)", 4) {
      exprs =>
        val t = SparkSession.active.table(litStr(exprs(0), "table"))
        expand(graft.operators.TextOps.urlBlocklistFilter(t,
          litStr(exprs(1), "id column"), litStr(exprs(2), "text column"),
          litStr(exprs(3), "blocked domains").split(",").map(_.trim)
            .filter(_.nonEmpty).toSeq))
    }
    registerTable("incremental_dedup",
      "incremental_dedup('increment', 'idCol', 'textCol', 'seenTable', 'fpCol') - " +
        "keep increment rows new against the md5 fingerprint store and first " +
        "within the increment; historical text is never rescanned", 5) {
      exprs =>
        val inc = SparkSession.active.table(litStr(exprs(0), "increment table"))
        val seen = SparkSession.active.table(litStr(exprs(3), "fingerprint table"))
        expand(graft.operators.Dedup.incrementalDedup(inc,
          litStr(exprs(1), "id column"), litStr(exprs(2), "text column"),
          seen, litStr(exprs(4), "fingerprint column")))
    }
    registerTable("dedup_paragraphs",
      "dedup_paragraphs('table', 'idCol', 'textCol') - corpus-wide exact paragraph " +
        "dedup: keep each paragraph at its first (doc, position) occurrence, " +
        "reassemble docs from survivors", 3) {
      exprs =>
        val t = SparkSession.active.table(litStr(exprs(0), "table"))
        expand(graft.operators.TextOps.dedupParagraphs(t,
          litStr(exprs(1), "id column"), litStr(exprs(2), "text column")))
    }
    registerTable("inverted_index",
      "inverted_index('table', 'idCol', 'textCol', minDf, maxPostings) - term stats + capped postings", 5) {
      exprs =>
        val t = SparkSession.active.table(litStr(exprs(0), "table"))
        expand(graft.operators.TextOps.invertedIndex(t,
          litStr(exprs(1), "id column"), litStr(exprs(2), "text column"),
          litInt(exprs(3), "minDf"), litInt(exprs(4), "maxPostings")))
    }
    registerTable("corpus_profile",
      "corpus_profile('table', 'stratum1,stratum2', 'textCol') - per-stratum corpus datasheet", 3) {
      exprs =>
        val t = SparkSession.active.table(litStr(exprs(0), "table"))
        expand(graft.operators.TextOps.corpusProfile(t,
          colList(litStr(exprs(1), "strata")), litStr(exprs(2), "text column")))
    }
    registerTable("boilerplate_coverage",
      "boilerplate_coverage('table', 'idCol', 'textCol', span, minDocs) - per-doc common-span fraction", 5) {
      exprs =>
        val t = SparkSession.active.table(litStr(exprs(0), "table"))
        expand(graft.operators.TextOps.boilerplateCoverage(t,
          litStr(exprs(1), "id column"), litStr(exprs(2), "text column"),
          litInt(exprs(3), "span"), litInt(exprs(4), "minDocs")))
    }
    registerTable("hybrid_search",
      "hybrid_search('docs', 'idCol', 'textCol', 'term1,term2', 'emb', 'embIdCol', " +
        "'vecCol', queryVecId, k, kEach) - BM25 + embedding-cosine reciprocal-rank fusion", 10) {
      exprs =>
        val docs = SparkSession.active.table(litStr(exprs(0), "docs table"))
        val emb = SparkSession.active.table(litStr(exprs(4), "embeddings table"))
        expand(graft.operators.Hybrid.hybridSearch(docs,
          litStr(exprs(1), "id column"), litStr(exprs(2), "text column"),
          litStr(exprs(3), "query terms").split(",").toSeq.map(_.trim).filter(_.nonEmpty),
          emb, litStr(exprs(5), "embedding id column"), litStr(exprs(6), "vector column"),
          litLong(exprs(7), "queryVecId"),
          litInt(exprs(8), "k"), litInt(exprs(9), "kEach")))
    }
    registerTable("strip_spans",
      "strip_spans('table', 'idCol', 'textCol', span, minDocs) - remove every " +
        "token inside a corpus-common span (boilerplate removal), keep the rest", 5) {
      exprs =>
        val t = SparkSession.active.table(litStr(exprs(0), "table"))
        expand(graft.operators.TextOps.stripRepeatedSpans(t,
          litStr(exprs(1), "id column"), litStr(exprs(2), "text column"),
          litInt(exprs(3), "span"), litInt(exprs(4), "minDocs")))
    }
    registerTable("diversity_sample",
      "diversity_sample('table', 'idCol', 'vecCol', nClusters, perCluster) - " +
        "k-means cluster-balanced draw over an embedding column", 5) {
      exprs =>
        val t = SparkSession.active.table(litStr(exprs(0), "table"))
        expand(graft.operators.Embeddings.diversitySample(t,
          litStr(exprs(1), "id column"), litStr(exprs(2), "vector column"),
          litInt(exprs(3), "nClusters"), litInt(exprs(4), "perCluster")))
    }
    registerTable("bpe_train",
      "bpe_train('table', 'textCol', numMerges) - learn a BPE merge table " +
        "(rank, left, right, pair_count) from the corpus word frequencies", 3) {
      exprs =>
        val t = SparkSession.active.table(litStr(exprs(0), "table"))
        expand(graft.operators.Bpe.bpeTrain(t,
          litStr(exprs(1), "text column"), litInt(exprs(2), "numMerges")))
    }
    registerTable("bpe_encode",
      "bpe_encode('table', 'idCol', 'textCol', 'mergesTable') - per-doc " +
        "(n_words, n_subwords) under a trained BPE merge table", 4) {
      exprs =>
        val t = SparkSession.active.table(litStr(exprs(0), "table"))
        val m = SparkSession.active.table(litStr(exprs(3), "merges table"))
        expand(graft.operators.Bpe.bpeEncode(t,
          litStr(exprs(1), "id column"), litStr(exprs(2), "text column"), m))
    }
    registerTable("source_overlap",
      "source_overlap('table', 'groupCol', 'textCol', n) - exact pairwise " +
        "n-gram-shingle Jaccard between sources (zero-overlap pairs omitted)", 4) {
      exprs =>
        val t = SparkSession.active.table(litStr(exprs(0), "table"))
        expand(graft.operators.Dedup.sourceOverlap(t,
          litStr(exprs(1), "group column"), litStr(exprs(2), "text column"),
          litInt(exprs(3), "n")))
    }
    registerTable("source_overlap_est",
      "source_overlap_est('table', 'groupCol', 'textCol', n, numPerms) - MinHash " +
        "estimate of source_overlap; corpus reduces to numPerms longs per source", 5) {
      exprs =>
        val t = SparkSession.active.table(litStr(exprs(0), "table"))
        expand(graft.operators.Dedup.sourceOverlapMinhash(t,
          litStr(exprs(1), "group column"), litStr(exprs(2), "text column"),
          litInt(exprs(3), "n"), litInt(exprs(4), "numPerms")))
    }
    registerTable("lm_score",
      "lm_score('table', 'idCol', 'textCol', alphaMicro, keepMaxMicroPerToken) - " +
        "self-trained add-α bigram LM perplexity filter (α in millionths, e.g. 100000 = 0.1)", 5) {
      exprs =>
        val t = SparkSession.active.table(litStr(exprs(0), "table"))
        expand(graft.operators.TextOps.ngramLmScore(t,
          litStr(exprs(1), "id column"), litStr(exprs(2), "text column"),
          alpha = litInt(exprs(3), "alphaMicro").toDouble / 1e6,
          keepMaxMicroPerToken = litLong(exprs(4), "keepMaxMicroPerToken")))
    }
    registerTable("decontaminate",
      "decontaminate('corpus', 'idCol', 'textCol', 'evalTable', 'evalIdCol', 'evalTextCol', n, minShared)" +
        " - (doc, eval) pairs sharing >= minShared distinct word n-grams (train/test overlap sweep)", 8) {
      exprs =>
        expand(graft.operators.Dedup.crossContamination(
          SparkSession.active.table(litStr(exprs(0), "corpus table")),
          litStr(exprs(1), "id column"), litStr(exprs(2), "text column"),
          SparkSession.active.table(litStr(exprs(3), "eval table")),
          litStr(exprs(4), "eval id column"), litStr(exprs(5), "eval text column"),
          litInt(exprs(6), "n"), litInt(exprs(7), "minShared")))
    }
    registerTable("hash_split",
      "hash_split('table', 'keyCol', 'train:80,valid:90,test:100') - stable md5-bucket split", 3) {
      exprs =>
        val t = SparkSession.active.table(litStr(exprs(0), "table"))
        val cuts = colList(litStr(exprs(2), "cuts")).map { entry =>
          entry.split(":") match {
            case Array(name, cut) if cut.trim.forall(_.isDigit) => name.trim -> cut.trim.toInt
            case _ => throw new IllegalArgumentException(
              s"hash_split cut '$entry' must be 'name:percent' (e.g. 'train:80')")
          }
        }
        expand(graft.operators.Relational.hashSplit(t, litStr(exprs(1), "key column"), cuts))
    }
    registerTable("stratified_split",
      "stratified_split('table', 'stratumCol', 'keyCol', 'train:900000,val:50000,test:50000') - " +
        "exact per-stratum split counts (largest-remainder over ppm weights, md5 rank order)", 4) {
      exprs =>
        val t = SparkSession.active.table(litStr(exprs(0), "table"))
        val splits = colList(litStr(exprs(3), "splits")).map { entry =>
          entry.split(":") match {
            case Array(name, ppm) if ppm.trim.nonEmpty && ppm.trim.forall(_.isDigit) =>
              name.trim -> ppm.trim.toLong
            case _ => throw new IllegalArgumentException(
              s"stratified_split entry '$entry' must be 'name:ppm' (e.g. 'train:900000')")
          }
        }
        expand(graft.operators.Relational.stratifiedSplit(t,
          litStr(exprs(1), "stratum column"), litStr(exprs(2), "key column"), splits))
    }
    registerTable("tfidf_keywords",
      "tfidf_keywords('table', 'idCol', 'textCol', k) - top-k smoothed tf-idf " +
        "terms per document (micro-quantized, term tie-break)", 4) {
      exprs =>
        val t = SparkSession.active.table(litStr(exprs(0), "table"))
        expand(graft.operators.TextOps.tfidfKeywords(t,
          litStr(exprs(1), "id column"), litStr(exprs(2), "text column"),
          litInt(exprs(3), "k")))
    }
    registerTable("dsir_select",
      "dsir_select('raw', 'target', 'idCol', 'textCol', buckets, k) - DSIR data " +
        "selection: top-k raw docs by hashed-bigram log-likelihood ratio toward the target domain", 6) {
      exprs =>
        expand(graft.operators.TextOps.dsirScore(
          SparkSession.active.table(litStr(exprs(0), "raw table")),
          SparkSession.active.table(litStr(exprs(1), "target table")),
          litStr(exprs(2), "id column"), litStr(exprs(3), "text column"),
          litInt(exprs(4), "buckets"), lambda = 1.0, k = litInt(exprs(5), "k")))
    }
    registerTable("weighted_mixture",
      "weighted_mixture('table', 'stratumCol', 'keyCol', 'a:2.5,b:1,c:0.25') - " +
        "deterministic training mix: stratum rows appear weight times in expectation, with copy_idx", 4) {
      exprs =>
        val t = SparkSession.active.table(litStr(exprs(0), "table"))
        val weights = colList(litStr(exprs(3), "weights")).map { entry =>
          entry.split(":") match {
            case Array(name, w) if w.trim.nonEmpty && w.trim.forall(c => c.isDigit || c == '.') =>
              name.trim -> w.trim.toDouble
            case _ => throw new IllegalArgumentException(
              s"weighted_mixture weight '$entry' must be 'stratum:weight' (e.g. 'en:2.5')")
          }
        }
        expand(graft.operators.Relational.weightedMixture(t,
          litStr(exprs(1), "stratum column"), litStr(exprs(2), "key column"), weights))
    }
    registerTable("token_budget",
      "token_budget('table', 'stratumCol', 'idCol', 'tokensCol', 'en:6000,de:2000') - " +
        "deterministic per-stratum token-budget draw (hash-order prefix incl. the crossing row)", 5) {
      exprs =>
        val t = SparkSession.active.table(litStr(exprs(0), "table"))
        val budgets = colList(litStr(exprs(4), "budgets")).map { entry =>
          entry.split(":") match {
            case Array(name, b) if b.trim.nonEmpty && b.trim.forall(_.isDigit) =>
              name.trim -> b.trim.toLong
            case _ => throw new IllegalArgumentException(
              s"token_budget entry '$entry' must be 'stratum:tokens' (e.g. 'en:6000')")
          }
        }
        expand(graft.operators.Relational.tokenBudgetSample(t,
          litStr(exprs(1), "stratum column"), litStr(exprs(2), "id column"),
          litStr(exprs(3), "tokens column"), budgets))
    }
    registerTable("seq_pack",
      "seq_pack('table', 'idCol', 'weightCol', budget) - contiguous token-budget pack ids", 4) {
      exprs =>
        val t = SparkSession.active.table(litStr(exprs(0), "table"))
        expand(graft.operators.TextOps.sequentialPack(t,
          litStr(exprs(1), "id column"), litStr(exprs(2), "weight column"),
          litLong(exprs(3), "budget")))
    }
    registerTable("quantize_int8",
      "quantize_int8('table', 'idCol', 'vecCol') - per-vector int8 quantization stats", 3) {
      exprs =>
        val t = SparkSession.active.table(litStr(exprs(0), "table"))
        expand(graft.operators.Embeddings.quantizeInt8(t,
          litStr(exprs(1), "id column"), litStr(exprs(2), "vector column")))
    }

    // ---- ANN family as TVFs: similarity SEARCH for plain-SQL users,
    // completing the near-dup surface above. All return
    // (query_id, neighbor_id, sim, rank). The model-based variants
    // (ann_ivf / ann_pq / ann_ivfpq) TRAIN on the corpus at resolution
    // time — the centroid/codebook collects are model fetches the Column
    // API does too; the model then rides the expanded plan as a literal.
    registerTable("ann_brute",
      "ann_brute('corpus', 'queries', 'idCol', 'vecCol', k) - exact cosine top-k per query", 5) {
      exprs =>
        expand(graft.operators.Similarity.bruteForceTopK(
          SparkSession.active.table(litStr(exprs(0), "corpus table")),
          SparkSession.active.table(litStr(exprs(1), "queries table")),
          litStr(exprs(2), "id column"), litStr(exprs(3), "vector column"),
          litInt(exprs(4), "k")))
    }
    registerTable("ann_lsh",
      "ann_lsh('corpus', 'queries', 'idCol', 'vecCol', k, nBits, bands) - " +
        "hyperplane-LSH bucketed approximate top-k", 7) {
      exprs =>
        expand(graft.operators.Similarity.lshTopK(
          SparkSession.active.table(litStr(exprs(0), "corpus table")),
          SparkSession.active.table(litStr(exprs(1), "queries table")),
          litStr(exprs(2), "id column"), litStr(exprs(3), "vector column"),
          litInt(exprs(4), "k"), litInt(exprs(5), "nBits"), litInt(exprs(6), "bands")))
    }
    registerTable("ann_ivf",
      "ann_ivf('corpus', 'queries', 'idCol', 'vecCol', k, nlist, nprobe) - " +
        "inverted-file approximate top-k (probes nprobe of nlist coarse lists)", 7) {
      exprs =>
        expand(graft.operators.Similarity.ivfTopK(
          SparkSession.active.table(litStr(exprs(0), "corpus table")),
          SparkSession.active.table(litStr(exprs(1), "queries table")),
          litStr(exprs(2), "id column"), litStr(exprs(3), "vector column"),
          litInt(exprs(4), "k"), litInt(exprs(5), "nlist"), litInt(exprs(6), "nprobe")))
    }
    registerTable("ann_pq",
      "ann_pq('corpus', 'queries', 'idCol', 'vecCol', k, m, codebookK, shortlist) - " +
        "product-quantization two-stage top-k (compressed scan -> exact rerank)", 8) {
      exprs =>
        val corpus = SparkSession.active.table(litStr(exprs(0), "corpus table"))
        val cb = graft.operators.Embeddings.pqTrain(corpus,
          litStr(exprs(2), "id column"), litStr(exprs(3), "vector column"),
          litInt(exprs(5), "m"), litInt(exprs(6), "codebookK"))
        expand(graft.operators.Embeddings.pqTopKRerank(corpus,
          SparkSession.active.table(litStr(exprs(1), "queries table")),
          litStr(exprs(2), "id column"), litStr(exprs(3), "vector column"),
          litInt(exprs(4), "k"), litInt(exprs(7), "shortlist"), cb))
    }
    registerTable("ann_pca",
      "ann_pca('corpus', 'queries', 'idCol', 'vecCol', k, kDims, shortlist) - " +
        "PCA-reduced two-stage top-k (reduced-space shortlist -> exact rerank)", 7) {
      exprs =>
        val corpus = SparkSession.active.table(litStr(exprs(0), "corpus table"))
        val model = graft.operators.Embeddings.pcaTrain(corpus,
          litStr(exprs(2), "id column"), litStr(exprs(3), "vector column"),
          litInt(exprs(5), "kDims"))
        expand(graft.operators.Embeddings.pcaTopKRerank(corpus,
          SparkSession.active.table(litStr(exprs(1), "queries table")),
          litStr(exprs(2), "id column"), litStr(exprs(3), "vector column"),
          litInt(exprs(4), "k"), litInt(exprs(6), "shortlist"), model))
    }
    registerTable("embed_neardup",
      "embed_neardup('table', 'idCol', 'vecCol', minSim) - cosine near-duplicate pairs; " +
        "dispatches exact-tiled vs banded-LSH on (threshold, corpus size)", 4) {
      exprs =>
        expand(graft.operators.Similarity.cosineNearDupAuto(
          SparkSession.active.table(litStr(exprs(0), "table")),
          litStr(exprs(1), "id column"), litStr(exprs(2), "vector column"),
          litDouble(exprs(3), "minSim")))
    }
    registerTable("incremental_neardup",
      "incremental_neardup('increment', 'idCol', 'textCol', 'storeTable', 'histIdCol', " +
        "'shinglesCol', n, minJaccardMicro) - increment docs whose n-gram Jaccard against " +
        "the hashed-shingle store reaches the threshold (millionths); history text never rescanned", 8) {
      exprs =>
        expand(graft.operators.Dedup.incrementalNearDup(
          SparkSession.active.table(litStr(exprs(0), "increment table")),
          litStr(exprs(1), "id column"), litStr(exprs(2), "text column"),
          SparkSession.active.table(litStr(exprs(3), "store table")),
          litStr(exprs(4), "history id column"), litStr(exprs(5), "shingles column"),
          litInt(exprs(6), "n"),
          litInt(exprs(7), "minJaccardMicro").toDouble / 1e6))
    }
    registerTable("embed_decontaminate",
      "embed_decontaminate('corpus', 'idCol', 'vecCol', 'refTable', 'refIdCol', 'refVecCol', minSim)" +
        " - (corpus, ref) embedding pairs at cosine >= minSim: semantic (paraphrase-level) " +
        "eval-contamination sweep; reference band rows + vectors broadcast", 7) {
      exprs =>
        expand(graft.operators.Similarity.crossNearDup(
          SparkSession.active.table(litStr(exprs(0), "corpus table")),
          litStr(exprs(1), "id column"), litStr(exprs(2), "vector column"),
          SparkSession.active.table(litStr(exprs(3), "reference table")),
          litStr(exprs(4), "reference id column"), litStr(exprs(5), "reference vector column"),
          litDouble(exprs(6), "minSim")))
    }
    registerTable("ann_ivfpq",
      "ann_ivfpq('corpus', 'queries', 'idCol', 'vecCol', k, nlist, m, codebookK, nprobe, shortlist)" +
        " - IVF-PQ composed index top-k (residual codes of nprobe lists -> exact rerank)", 10) {
      exprs =>
        val corpus = SparkSession.active.table(litStr(exprs(0), "corpus table"))
        val model = graft.operators.Embeddings.ivfPqTrain(corpus,
          litStr(exprs(2), "id column"), litStr(exprs(3), "vector column"),
          litInt(exprs(5), "nlist"), litInt(exprs(6), "m"), litInt(exprs(7), "codebookK"))
        expand(graft.operators.Embeddings.ivfPqTopKRerank(corpus,
          SparkSession.active.table(litStr(exprs(1), "queries table")),
          litStr(exprs(2), "id column"), litStr(exprs(3), "vector column"),
          litInt(exprs(4), "k"), litInt(exprs(8), "nprobe"),
          litInt(exprs(9), "shortlist"), model))
    }
    registerTable("knn_graph",
      "knn_graph('table', 'idCol', 'vecCol', k) - directed exact k-nearest-" +
        "neighbor graph over one embedding table (tiled self-join + bounded-state top-k)", 4) {
      exprs =>
        expand(graft.operators.Similarity.knnGraph(
          SparkSession.active.table(litStr(exprs(0), "table")),
          litStr(exprs(1), "id column"), litStr(exprs(2), "vector column"),
          litInt(exprs(3), "k")))
    }
    registerTable("ivf_knn_graph",
      "ivf_knn_graph('table', 'idCol', 'vecCol', k) - PRODUCTION k-nearest-" +
        "neighbor graph: exact-integer IVF partition + probe-cell candidates + " +
        "exact cosine re-rank (sub-quadratic; knn_graph is its exhaustive audit)", 4) {
      exprs =>
        expand(graft.operators.Similarity.ivfKnnGraph(
          SparkSession.active.table(litStr(exprs(0), "table")),
          litStr(exprs(1), "id column"), litStr(exprs(2), "vector column"),
          litInt(exprs(3), "k")))
    }
    registerTable("hard_negatives",
      "hard_negatives('corpus', 'queries', 'idCol', 'vecCol', k, loSimMicro, hiSimMicro) - " +
        "per query, top-k corpus rows in the cosine band [lo, hi) (millionths): " +
        "contrastive-training negative mining", 7) {
      exprs =>
        expand(graft.operators.Similarity.hardNegatives(
          SparkSession.active.table(litStr(exprs(0), "corpus table")),
          SparkSession.active.table(litStr(exprs(1), "queries table")),
          litStr(exprs(2), "id column"), litStr(exprs(3), "vector column"),
          litInt(exprs(4), "k"),
          litInt(exprs(5), "loSimMicro").toDouble / 1e6,
          litInt(exprs(6), "hiSimMicro").toDouble / 1e6))
    }
    registerTable("contrastive_pairs",
      "contrastive_pairs('corpus', 'anchors', 'idCol', 'vecCol', posMinMicro, nNeg, " +
        "negLoMicro, negHiMicro) - per anchor one positive >= posMin plus top-nNeg " +
        "band negatives; anchors without a positive emit nothing", 8) {
      exprs =>
        expand(graft.operators.Similarity.contrastivePairs(
          SparkSession.active.table(litStr(exprs(0), "corpus table")),
          SparkSession.active.table(litStr(exprs(1), "anchors table")),
          litStr(exprs(2), "id column"), litStr(exprs(3), "vector column"),
          litInt(exprs(4), "posMinMicro").toDouble / 1e6,
          litInt(exprs(5), "nNeg"),
          litInt(exprs(6), "negLoMicro").toDouble / 1e6,
          litInt(exprs(7), "negHiMicro").toDouble / 1e6))
    }
    registerTable("split_leakage",
      "split_leakage('table', 'idCol', 'textCol', trainPct, validPct, n, minJaccardMicro) - " +
        "near-dup pairs (exact n-gram Jaccard) crossing the content-hash " +
        "train/valid/test split: eval-contamination audit", 7) {
      exprs =>
        expand(graft.operators.Dedup.splitLeakage(
          SparkSession.active.table(litStr(exprs(0), "table")),
          litStr(exprs(1), "id column"), litStr(exprs(2), "text column"),
          Seq("train" -> litInt(exprs(3), "trainPct"),
            "valid" -> litInt(exprs(4), "validPct"), "test" -> 100),
          litInt(exprs(5), "n"),
          litInt(exprs(6), "minJaccardMicro").toDouble / 1e6))
    }
    registerTable("source_drift",
      "source_drift('table', 'groupCol', 'textCol', buckets) - per-group smoothed " +
        "KL + total-variation drift from the corpus token mixture (nano-quantized)", 4) {
      exprs =>
        expand(graft.operators.TextOps.unigramDrift(
          SparkSession.active.table(litStr(exprs(0), "table")),
          litStr(exprs(1), "group column"), litStr(exprs(2), "text column"),
          litInt(exprs(3), "buckets")))
    }
    registerTable("nb_classify",
      "nb_classify('train', 'score', 'idCol', 'textCol', 'labelCol') - multinomial " +
        "Naive Bayes trained on the labeled table, scoring the other (micro-nat " +
        "log-posteriors + margins)", 5) {
      exprs =>
        expand(graft.operators.TextOps.nbTrainScore(
          SparkSession.active.table(litStr(exprs(0), "train table")),
          SparkSession.active.table(litStr(exprs(1), "score table")),
          litStr(exprs(2), "id column"), litStr(exprs(3), "text column"),
          litStr(exprs(4), "label column")))
    }
    registerTable("winnow_pairs",
      "winnow_pairs('table', 'idCol', 'textCol', k, w, minShared) - document pairs " +
        "sharing >= minShared winnowed (MOSS) fingerprints: lifted-passage / " +
        "partial-overlap sweep", 6) {
      exprs =>
        expand(graft.operators.TextOps.winnowOverlapPairs(
          SparkSession.active.table(litStr(exprs(0), "table")),
          litStr(exprs(1), "id column"), litStr(exprs(2), "text column"),
          litInt(exprs(3), "k"), litInt(exprs(4), "w"), litInt(exprs(5), "minShared")))
    }
    registerTable("dedup_keep_best",
      "dedup_keep_best('table', 'idCol', 'textCol', 'qualityCol', n, minJaccardMicro) - " +
        "one survivor per near-dup cluster: the (quality DESC, id ASC) best copy, " +
        "tagged with cluster_rep", 6) {
      exprs =>
        expand(graft.operators.Dedup.dedupKeepBest(
          SparkSession.active.table(litStr(exprs(0), "table")),
          litStr(exprs(1), "id column"), litStr(exprs(2), "text column"),
          litStr(exprs(3), "quality column"),
          litInt(exprs(4), "n"),
          litInt(exprs(5), "minJaccardMicro").toDouble / 1e6))
    }
    registerTable("winnow_incremental",
      "winnow_incremental('increment', 'idCol', 'textCol', 'storeTable', 'histIdCol', " +
        "'fpCol', k, w, minShared) - increment docs sharing >= minShared winnowed " +
        "fingerprints with the persisted store; history text never rescanned", 9) {
      exprs =>
        expand(graft.operators.TextOps.winnowIncremental(
          SparkSession.active.table(litStr(exprs(0), "increment table")),
          litStr(exprs(1), "id column"), litStr(exprs(2), "text column"),
          SparkSession.active.table(litStr(exprs(3), "store table")),
          litStr(exprs(4), "history id column"), litStr(exprs(5), "fingerprint column"),
          litInt(exprs(6), "k"), litInt(exprs(7), "w"), litInt(exprs(8), "minShared")))
    }
    registerTable("shard_manifest",
      "shard_manifest('table', 'keyCol', 'bytesCol', nShards) - content-addressed " +
        "per-shard manifest (rows, bytes, order-independent content sum, key range)", 4) {
      exprs =>
        expand(graft.operators.Relational.shardManifest(
          SparkSession.active.table(litStr(exprs(0), "table")),
          litStr(exprs(1), "key column"), litStr(exprs(2), "bytes column"),
          litInt(exprs(3), "nShards")))
    }

    registerTable("snapshot_diff",
      "snapshot_diff('oldTable', 'newTable', 'keyCol', 'compareCol') - CDC between " +
        "two snapshots: added/removed/changed keys with md5 content fingerprints", 4) {
      exprs =>
        expand(graft.operators.Relational.snapshotDiff(
          SparkSession.active.table(litStr(exprs(0), "old table")),
          SparkSession.active.table(litStr(exprs(1), "new table")),
          Seq(litStr(exprs(2), "key column")), Seq(litStr(exprs(3), "compare column"))))
    }
    registerTable("k_anonymize",
      "k_anonymize('table', 'col1,col2,...', k) - bottom-up global recoding: every " +
        "published quasi-identifier combination covers >= k rows, rare groups " +
        "masked column-by-column from the last, unfixable rows suppressed", 3) {
      exprs =>
        expand(graft.operators.Relational.kAnonymize(
          SparkSession.active.table(litStr(exprs(0), "table")),
          litStr(exprs(1), "quasi columns").split(",").map(_.trim).toSeq,
          litInt(exprs(2), "k")))
    }
    registerTable("fim",
      "fim('table', 'idCol', 'textCol', minChars) - content-addressed " +
        "fill-in-the-middle split (prefix/middle/suffix + PSM training string)", 4) {
      exprs =>
        expand(graft.operators.Relational.fimTransform(
          SparkSession.active.table(litStr(exprs(0), "table")),
          litStr(exprs(1), "id column"), litStr(exprs(2), "text column"),
          litInt(exprs(3), "minChars")))
    }
    registerTable("dedup_aware_split",
      "dedup_aware_split('table', 'idCol', 'textCol', n, minJaccardMicro, " +
        "'train:80,valid:90,test:100') - split assigned from the near-dup " +
        "CLUSTER representative's hash: near-duplicates never straddle splits", 6) {
      exprs =>
        val cuts = colList(litStr(exprs(5), "cuts")).map { entry =>
          entry.split(":") match {
            case Array(name, pct) if pct.trim.nonEmpty && pct.trim.forall(_.isDigit) =>
              name.trim -> pct.trim.toInt
            case _ => throw new IllegalArgumentException(
              s"dedup_aware_split entry '$entry' must be 'name:cumulativePct'")
          }
        }
        expand(graft.operators.Dedup.dedupAwareSplit(
          SparkSession.active.table(litStr(exprs(0), "table")),
          litStr(exprs(1), "id column"), litStr(exprs(2), "text column"),
          litInt(exprs(3), "n"),
          litInt(exprs(4), "minJaccardMicro").toDouble / 1e6, cuts))
    }
    registerTable("span_corrupt",
      "span_corrupt('table', 'idCol', 'textCol', maskPct, spanLen) - T5-style " +
        "span corruption: sentinel-masked text + sentinel-prefixed targets, " +
        "content-addressed mask draw", 5) {
      exprs =>
        expand(graft.operators.TextOps.spanCorrupt(
          SparkSession.active.table(litStr(exprs(0), "table")),
          litStr(exprs(1), "id column"), litStr(exprs(2), "text column"),
          litInt(exprs(3), "maskPct"), litInt(exprs(4), "spanLen")))
    }
    registerTable("rebalance_mixture",
      "rebalance_mixture('table', 'stratumCol', 'keyCol', 'tokensCol', " +
        "'en:250000,de:250000,...') - replicate rows so each stratum's token mass " +
        "lands on its ppm share of the kept total (weights derived from the data)", 5) {
      exprs =>
        val targets = colList(litStr(exprs(4), "targets")).map { entry =>
          entry.split(":") match {
            case Array(name, ppm) if ppm.trim.nonEmpty && ppm.trim.forall(_.isDigit) =>
              name.trim -> ppm.trim.toLong / 1e6
            case _ => throw new IllegalArgumentException(
              s"rebalance_mixture entry '$entry' must be 'stratum:ppm' (e.g. 'en:250000')")
          }
        }
        expand(graft.operators.Relational.rebalancedMixture(
          SparkSession.active.table(litStr(exprs(0), "table")),
          litStr(exprs(1), "stratum column"), litStr(exprs(2), "key column"),
          litStr(exprs(3), "tokens column"), targets))
    }
    registerTable("rouge",
      "rouge('docsTable', 'idCol', 'textCol', 'pairsTable', 'aCol', 'bCol') - " +
        "ROUGE-1/2 P/R/F (multiset-clipped, integer micro-units) per pair", 6) {
      exprs =>
        expand(graft.operators.TextOps.rougeScores(
          SparkSession.active.table(litStr(exprs(0), "docs table")),
          litStr(exprs(1), "id column"), litStr(exprs(2), "text column"),
          SparkSession.active.table(litStr(exprs(3), "pairs table")),
          litStr(exprs(4), "pair a column"), litStr(exprs(5), "pair b column")))
    }
    registerTable("bleu",
      "bleu('docsTable', 'idCol', 'textCol', 'pairsTable', 'aCol', 'bCol') - " +
        "BLEU-2 per pair (candidate = aCol, reference = bCol): clipped n-gram " +
        "precisions, brevity penalty, geometric mean — integer micro-units", 6) {
      exprs =>
        expand(graft.operators.TextOps.bleuScores(
          SparkSession.active.table(litStr(exprs(0), "docs table")),
          litStr(exprs(1), "id column"), litStr(exprs(2), "text column"),
          SparkSession.active.table(litStr(exprs(3), "pairs table")),
          litStr(exprs(4), "pair a column"), litStr(exprs(5), "pair b column")))
    }
    registerTable("chrf",
      "chrf('docsTable', 'idCol', 'textCol', 'pairsTable', 'aCol', 'bCol') - " +
        "chrF (char n-grams 1..3, beta=2) per pair: averaged clipped " +
        "precision/recall, F-beta — integer micro-units", 6) {
      exprs =>
        expand(graft.operators.TextOps.chrfScores(
          SparkSession.active.table(litStr(exprs(0), "docs table")),
          litStr(exprs(1), "id column"), litStr(exprs(2), "text column"),
          SparkSession.active.table(litStr(exprs(3), "pairs table")),
          litStr(exprs(4), "pair a column"), litStr(exprs(5), "pair b column")))
    }
    registerTable("token_f1",
      "token_f1('docsTable', 'idCol', 'textCol', 'pairsTable', 'aCol', 'bCol') - " +
        "token-level F1 + exact match per pair (SQuAD answer scoring) — " +
        "exact integer micro-units; per-row scalar twin: token_f1_micro(a, b)", 6) {
      exprs =>
        expand(graft.operators.TextOps.tokenF1Scores(
          SparkSession.active.table(litStr(exprs(0), "docs table")),
          litStr(exprs(1), "id column"), litStr(exprs(2), "text column"),
          SparkSession.active.table(litStr(exprs(3), "pairs table")),
          litStr(exprs(4), "pair a column"), litStr(exprs(5), "pair b column")))
    }
    registerTable("bradley_terry",
      "bradley_terry('compsTable', 'winnerCol', 'loserCol', rounds) - " +
        "Bradley-Terry strength ratings from pairwise outcomes (Hunter MM, " +
        "fixed synchronous rounds, integer micro-units, mean-1e6 gauge)", 4) {
      exprs =>
        expand(graft.operators.Rank.bradleyTerry(
          SparkSession.active.table(litStr(exprs(0), "comparisons table")),
          litStr(exprs(1), "winner column"), litStr(exprs(2), "loser column"),
          litInt(exprs(3), "rounds")))
    }
    registerTable("bradley_terry_weighted",
      "bradley_terry_weighted('compsTable', 'winnerCol', 'loserCol', 'weightCol', rounds) - " +
        "Bradley-Terry over a PRE-AGGREGATED duel log (each row counts weightCol " +
        "duels) — equivalent to the exploded log; feeds drained streaming state", 5) {
      exprs =>
        expand(graft.operators.Rank.bradleyTerry(
          SparkSession.active.table(litStr(exprs(0), "comparisons table")),
          litStr(exprs(1), "winner column"), litStr(exprs(2), "loser column"),
          litInt(exprs(4), "rounds"), litStr(exprs(3), "weight column")))
    }
    registerTable("spearman",
      "spearman('table', 'aCol', 'bCol', 'keyCol') - exact-integer Spearman " +
        "rank correlation between two scores of a keyed frame (strict " +
        "tie-broken total orders, distributed prefix-sum ranks); one row " +
        "(n, rho_micro)", 4) {
      exprs =>
        expand(graft.operators.Rank.spearmanCorr(
          SparkSession.active.table(litStr(exprs(0), "table")),
          litStr(exprs(1), "a column"), litStr(exprs(2), "b column"),
          litStr(exprs(3), "key column")))
    }
    registerTable("pass_at_k",
      "pass_at_k('samplesTable', 'problemCol', 'passCol', k) - the HumanEval " +
        "unbiased estimator 1 - C(n-c,k)/C(n,k) per problem (product form, " +
        "micro-units; NULL when n < k)", 4) {
      exprs =>
        expand(graft.operators.Rank.passAtK(
          SparkSession.active.table(litStr(exprs(0), "samples table")),
          litStr(exprs(1), "problem column"), litStr(exprs(2), "pass column"),
          Seq(litInt(exprs(3), "k"))))
    }
    registerTable("unimax",
      "unimax('table', 'sourceCol', 'tokensCol', budgetTokens, maxEpochs) - " +
        "UniMax epoch-capped token-budget allocation across sources " +
        "(capped ascending prefix + equal shares, exact integers)", 5) {
      exprs =>
        expand(graft.operators.Relational.unimaxAllocation(
          SparkSession.active.table(litStr(exprs(0), "table")),
          litStr(exprs(1), "source column"), litStr(exprs(2), "tokens column"),
          litLong(exprs(3), "budgetTokens"), litInt(exprs(4), "maxEpochs")))
    }
    registerTable("roc_auc",
      "roc_auc('table', 'scoreCol', 'labelCol') - tie-corrected Mann-Whitney " +
        "ROC-AUC of a score against a boolean label (exact midrank integers, " +
        "distributed prefix-sum ranks); one row (n_pos, n_neg, auc_micro)", 3) {
      exprs =>
        expand(graft.operators.Metrics.rocAuc(
          SparkSession.active.table(litStr(exprs(0), "table")),
          litStr(exprs(1), "score column"), litStr(exprs(2), "label column")))
    }
    registerTable("ks_two_sample",
      "ks_two_sample('table', 'valueCol', 'sideCol') - two-sample " +
        "Kolmogorov-Smirnov drift statistic (exact cross-multiplied ECDF sup); " +
        "one row (n_a, n_b, d_micro, at_value)", 3) {
      exprs =>
        expand(graft.operators.Metrics.ksTwoSample(
          SparkSession.active.table(litStr(exprs(0), "table")),
          litStr(exprs(1), "value column"), litStr(exprs(2), "side column")))
    }
    registerTable("ks_from_counts",
      "ks_from_counts('countsTable', 'valueCol', 'aCol', 'bCol') - the KS " +
        "statistic over PRE-AGGREGATED value-grain counts (weighted form — " +
        "drained streaming count state feeds it directly)", 4) {
      exprs =>
        expand(graft.operators.Metrics.ksFromCounts(
          SparkSession.active.table(litStr(exprs(0), "counts table")),
          litStr(exprs(1), "value column"), litStr(exprs(2), "a count column"),
          litStr(exprs(3), "b count column")))
    }
    registerTable("chi_square",
      "chi_square('table', 'aCol', 'bCol') - Pearson chi-square test of " +
        "independence + Cramer's V2 effect size over the full r x c grid " +
        "(exact split-division micro-units); one row (n, dof, chi2_micro, " +
        "cramers_v2_micro)", 3) {
      exprs =>
        expand(graft.operators.Metrics.chiSquareIndependence(
          SparkSession.active.table(litStr(exprs(0), "table")),
          litStr(exprs(1), "a column"), litStr(exprs(2), "b column")))
    }
    registerTable("chi_square_from_counts",
      "chi_square_from_counts('countsTable', 'aCol', 'bCol', 'nCol') - the " +
        "chi-square test over PRE-AGGREGATED cell counts (weighted form — " +
        "drained streaming count state feeds it directly)", 4) {
      exprs =>
        expand(graft.operators.Metrics.chiSquareFromCounts(
          SparkSession.active.table(litStr(exprs(0), "counts table")),
          litStr(exprs(1), "a column"), litStr(exprs(2), "b column"),
          litStr(exprs(3), "count column")))
    }
    registerTable("l_diversity",
      "l_diversity('table', 'quasi1,quasi2', 'sensitiveCol', l, c) - " +
        "l-diversity audit per equivalence class: distinct-l and recursive " +
        "(c,l) verdicts (exact integers); run k_anonymize first to fix " +
        "failing classes", 5) {
      exprs =>
        expand(graft.operators.Privacy.lDiversityAudit(
          SparkSession.active.table(litStr(exprs(0), "table")),
          litStr(exprs(1), "quasi columns").split(",").map(_.trim).toSeq,
          litStr(exprs(2), "sensitive column"),
          litInt(exprs(3), "l"), litInt(exprs(4), "c")))
    }
    registerTable("t_closeness",
      "t_closeness('table', 'quasi1,quasi2', 'sensitiveCol') - t-closeness " +
        "audit per equivalence class: ordered-EMD distance of the class's " +
        "sensitive distribution from the population's (exact micro-units)", 3) {
      exprs =>
        expand(graft.operators.Privacy.tCloseness(
          SparkSession.active.table(litStr(exprs(0), "table")),
          litStr(exprs(1), "quasi columns").split(",").map(_.trim).toSeq,
          litStr(exprs(2), "sensitive column")))
    }
    registerTable("temperature_mix",
      "temperature_mix('table', 'sourceCol', 'tokensCol', budgetTokens) - " +
        "alpha=1/2 temperature-sampled mixture allocation (sqrt weights — " +
        "exact across engines — + Hamilton largest-remainder); draws may " +
        "exceed a source's tokens (epochs > 1 is the point); compose with " +
        "unimax for an epoch cap", 4) {
      exprs =>
        expand(graft.operators.Relational.temperatureAllocation(
          SparkSession.active.table(litStr(exprs(0), "table")),
          litStr(exprs(1), "source column"), litStr(exprs(2), "tokens column"),
          litLong(exprs(3), "budgetTokens")))
    }
    registerTable("preference_cycles",
      "preference_cycles('duelsTable', 'winnerCol', 'loserCol') - every " +
        "majority-preference 3-cycle (a beats b beats c beats a) in the duel " +
        "graph — the annotation-QA gate before trusting a bradley_terry " +
        "board; ties are ambivalent (no edge); degree-oriented wedges, " +
        "hub-safe", 3) {
      exprs =>
        expand(graft.operators.Rank.preferenceCycles(
          SparkSession.active.table(litStr(exprs(0), "duels table")),
          litStr(exprs(1), "winner column"), litStr(exprs(2), "loser column")))
    }
    registerTable("concentration_profile",
      "concentration_profile('table', 'keyCol', 'weightCol') - Gini / HHI / " +
        "top-share concentration of an integral weight over a key universe " +
        "(exact integer rationals, prefix-sum ranks); one row (n_keys, total, " +
        "gini_micro, hhi_micro, top1_micro, top10_micro)", 3) {
      exprs =>
        expand(graft.operators.Metrics.concentrationProfile(
          SparkSession.active.table(litStr(exprs(0), "table")),
          litStr(exprs(1), "key column"), litStr(exprs(2), "weight column")))
    }
    registerTable("js_divergence",
      "js_divergence('table', 'valueCol', 'sideCol') - Jensen-Shannon " +
        "divergence (nats, micro-quantized) between the side-true and " +
        "side-false categorical distributions — the always-finite drift " +
        "companion to ks_two_sample for unordered categories", 3) {
      exprs =>
        expand(graft.operators.Metrics.jsDivergence(
          SparkSession.active.table(litStr(exprs(0), "table")),
          litStr(exprs(1), "value column"), litStr(exprs(2), "side column")))
    }
    registerTable("classification_report",
      "classification_report('table', 'labelCol', 'predCol') - per-class " +
        "support/tp/fp/fn + precision/recall/F1 (exact integer floors, " +
        "F1 = 2tp/(2tp+fp+fn)); class universe = labels UNION predictions " +
        "so broken classes cannot hide", 3) {
      exprs =>
        expand(graft.operators.Metrics.classificationReport(
          SparkSession.active.table(litStr(exprs(0), "table")),
          litStr(exprs(1), "label column"), litStr(exprs(2), "prediction column")))
    }
    registerTable("fairness_report",
      "fairness_report('table', 'groupCol', 'labelCol', 'predCol') - " +
        "group-fairness audit of a binary classifier: per-group selection " +
        "rate / TPR / FPR with signed gaps vs the pooled rates (exact " +
        "integer floors) — run before shipping any quality filter", 4) {
      exprs =>
        expand(graft.operators.Metrics.fairnessReport(
          SparkSession.active.table(litStr(exprs(0), "table")),
          litStr(exprs(1), "group column"), litStr(exprs(2), "label column"),
          litStr(exprs(3), "prediction column")))
    }
    registerTable("fairness_from_counts",
      "fairness_from_counts('countsTable', 'groupCol', 'labelCol', 'predCol', " +
        "'nCol') - the fairness report over PRE-AGGREGATED confusion cells " +
        "(weighted form — drained streaming count state feeds it directly)", 5) {
      exprs =>
        expand(graft.operators.Metrics.fairnessFromCounts(
          SparkSession.active.table(litStr(exprs(0), "counts table")),
          litStr(exprs(1), "group column"), litStr(exprs(2), "label column"),
          litStr(exprs(3), "prediction column"), litStr(exprs(4), "count column")))
    }
    registerTable("mcnemar",
      "mcnemar('table', 'aCorrectCol', 'bCorrectCol') - McNemar's paired " +
        "test between two classifiers judged on the SAME rows (discordant " +
        "counts, (b-c)^2/(b+c), no continuity correction); one row " +
        "(n, b_discordant, c_discordant, chi2_micro)", 3) {
      exprs =>
        expand(graft.operators.Metrics.mcnemar(
          SparkSession.active.table(litStr(exprs(0), "table")),
          litStr(exprs(1), "A verdict column"), litStr(exprs(2), "B verdict column")))
    }
    registerTable("matthews_corr",
      "matthews_corr('table', 'labelCol', 'predCol') - multiclass Matthews " +
        "correlation (Gorodkin R_K) over the classification_report " +
        "confusion grain; exact integer marginals, micro-quantized " +
        "factored-sqrt finale; one row (n, n_correct, n_classes, mcc_micro)",
      3) {
      exprs =>
        expand(graft.operators.Metrics.matthewsCorrelation(
          SparkSession.active.table(litStr(exprs(0), "table")),
          litStr(exprs(1), "label column"), litStr(exprs(2), "prediction column")))
    }
    registerTable("classification_summary",
      "classification_summary('table', 'labelCol', 'predCol') - macro/" +
        "micro one-row summary of the classification report: micro " +
        "accuracy + macro P/R/F1 under the explicit exclude-and-count " +
        "NULL policy (undefined classes excluded from the mean, their " +
        "counts reported)", 3) {
      exprs =>
        expand(graft.operators.Metrics.classificationSummary(
          SparkSession.active.table(litStr(exprs(0), "table")),
          litStr(exprs(1), "label column"), litStr(exprs(2), "prediction column")))
    }
    registerTable("cohen_kappa_from_counts",
      "cohen_kappa_from_counts('countsTable', 'aCol', 'bCol', 'nCol') - " +
        "Cohen's kappa over PRE-AGGREGATED confusion cells (weighted form " +
        "— drained streaming count state feeds it directly)", 4) {
      exprs =>
        expand(graft.operators.Metrics.cohenKappaFromCounts(
          SparkSession.active.table(litStr(exprs(0), "counts table")),
          litStr(exprs(1), "a column"), litStr(exprs(2), "b column"),
          litStr(exprs(3), "count column")))
    }
    registerTable("fleiss_kappa_from_counts",
      "fleiss_kappa_from_counts('countsTable', 'itemCol', 'categoryCol', " +
        "'nCol') - Fleiss' kappa over PRE-AGGREGATED (item, category) " +
        "rating cells (weighted form - the annotation-job monitor shape)",
      4) {
      exprs =>
        expand(graft.operators.Metrics.fleissKappaFromCounts(
          SparkSession.active.table(litStr(exprs(0), "counts table")),
          litStr(exprs(1), "item column"), litStr(exprs(2), "category column"),
          litStr(exprs(3), "count column")))
    }
    registerTable("fleiss_kappa",
      "fleiss_kappa('table', 'itemCol', 'categoryCol') - Fleiss' kappa " +
        "over a one-row-per-rating table (fixed rater count per item " +
        "enforced loudly); exact integer rational, negative-safe micro " +
        "floor; one row (n_items, n_raters, n_categories, kappa_micro)",
      3) {
      exprs =>
        expand(graft.operators.Metrics.fleissKappa(
          SparkSession.active.table(litStr(exprs(0), "table")),
          litStr(exprs(1), "item column"), litStr(exprs(2), "category column")))
    }
    registerTable("average_precision",
      "average_precision('table', 'scoreCol', 'labelCol') - PR-curve area " +
        "(AP) of a score against a boolean label — roc_auc's companion for " +
        "imbalanced classes; step-wise tie blocks, exact per-block floors; " +
        "one row (n_pos, n_neg, ap_micro)", 3) {
      exprs =>
        expand(graft.operators.Metrics.averagePrecision(
          SparkSession.active.table(litStr(exprs(0), "table")),
          litStr(exprs(1), "score column"), litStr(exprs(2), "label column")))
    }
    registerTable("gains_table",
      "gains_table('table', 'scoreCol', 'labelCol', buckets) - gains / lift " +
        "decile analysis of a score vs a boolean label (cumulative positive " +
        "capture + lift vs random, exact floors; tie blocks never split)", 4) {
      exprs =>
        expand(graft.operators.Metrics.gainsTable(
          SparkSession.active.table(litStr(exprs(0), "table")),
          litStr(exprs(1), "score column"), litStr(exprs(2), "label column"),
          litInt(exprs(3), "buckets")))
    }
    registerTable("prob_scorecard",
      "prob_scorecard('table', 'probMicroCol', 'labelCol', bins) - Brier " +
        "score + Expected Calibration Error over micro-unit probabilities " +
        "(exact rationals; out-of-range fails loudly); one row " +
        "(n, n_pos, brier_micro, ece_micro)", 4) {
      exprs =>
        expand(graft.operators.Metrics.probScorecard(
          SparkSession.active.table(litStr(exprs(0), "table")),
          litStr(exprs(1), "probability column"), litStr(exprs(2), "label column"),
          litInt(exprs(3), "bins")))
    }
    registerTable("psi",
      "psi('table', 'valueCol', 'sideCol') - Population Stability Index " +
        "between the side-true (reference) and side-false (actual) binned " +
        "distributions (< 0.1 stable, > 0.25 act); fails loudly on a bin " +
        "empty on one side — re-bin coarser rather than silently smooth", 3) {
      exprs =>
        expand(graft.operators.Metrics.psi(
          SparkSession.active.table(litStr(exprs(0), "table")),
          litStr(exprs(1), "value column"), litStr(exprs(2), "side column")))
    }
    registerTable("psi_from_counts",
      "psi_from_counts('countsTable', 'valueCol', 'aCol', 'bCol') - PSI over " +
        "PRE-AGGREGATED bin counts (weighted form — drained streaming count " +
        "state feeds it directly)", 4) {
      exprs =>
        expand(graft.operators.Metrics.psiFromCounts(
          SparkSession.active.table(litStr(exprs(0), "counts table")),
          litStr(exprs(1), "value column"), litStr(exprs(2), "a count column"),
          litStr(exprs(3), "b count column")))
    }
    registerTable("jsd_from_counts",
      "jsd_from_counts('countsTable', 'valueCol', 'aCol', 'bCol') - the JSD " +
        "over PRE-AGGREGATED value-grain counts (weighted form — drained " +
        "streaming count state feeds it directly)", 4) {
      exprs =>
        expand(graft.operators.Metrics.jsdFromCounts(
          SparkSession.active.table(litStr(exprs(0), "counts table")),
          litStr(exprs(1), "value column"), litStr(exprs(2), "a count column"),
          litStr(exprs(3), "b count column")))
    }
    registerTable("cohen_kappa",
      "cohen_kappa('table', 'raterACol', 'raterBCol') - Cohen's kappa " +
        "inter-annotator agreement (exact rational, negative-safe floor); " +
        "one row (n, agree, po_micro, kappa_micro)", 3) {
      exprs =>
        expand(graft.operators.Metrics.cohenKappa(
          SparkSession.active.table(litStr(exprs(0), "table")),
          litStr(exprs(1), "rater A column"), litStr(exprs(2), "rater B column")))
    }
    registerTable("retrieval_metrics",
      "retrieval_metrics('table', 'queryCol', 'relCol', 'scoreCol', 'tieCol', k) - " +
        "per-query MRR / DCG@k / NDCG@k / precision@k / recall@k over results " +
        "ranked by (score DESC, tie ASC); literal-constant discounts, integer sums", 6) {
      exprs =>
        expand(graft.operators.Metrics.retrievalMetrics(
          SparkSession.active.table(litStr(exprs(0), "table")),
          litStr(exprs(1), "query column"), litStr(exprs(2), "relevance column"),
          Seq(org.apache.spark.sql.functions.col(litStr(exprs(3), "score column")).desc,
            org.apache.spark.sql.functions.col(litStr(exprs(4), "tie column"))),
          litInt(exprs(5), "k")))
    }
    registerTable("pagerank",
      "pagerank('edgeTable', 'srcCol', 'dstCol', iterations) - integer micro-unit " +
        "PageRank (damping 0.85), fixed synchronous rounds, deterministic", 4) {
      exprs =>
        expand(graft.operators.Graph.pageRank(
          SparkSession.active.table(litStr(exprs(0), "edge table")),
          litStr(exprs(1), "source column"), litStr(exprs(2), "destination column"),
          litInt(exprs(3), "iterations")))
    }
    registerTable("label_prop",
      "label_prop('edgeTable', 'srcCol', 'dstCol', 'seedTable', 'seedIdCol', " +
        "'seedLabelCol', rounds) - semi-supervised plurality-vote label spread, " +
        "frozen seeds, min-label tie-break", 7) {
      exprs =>
        expand(graft.operators.Graph.labelPropagation(
          SparkSession.active.table(litStr(exprs(0), "edge table")),
          litStr(exprs(1), "source column"), litStr(exprs(2), "destination column"),
          SparkSession.active.table(litStr(exprs(3), "seed table")),
          litStr(exprs(4), "seed id column"), litStr(exprs(5), "seed label column"),
          litInt(exprs(6), "rounds")))
    }

    registerTable("gopher_rules",
      "gopher_rules('table', 'idCol', 'textCol') - Gopher (Rae et al. 2021 A1.1) " +
        "document-quality counters + 0/1 rule flags + pass, integer-exact; " +
        "stateless per-row projection (streams verbatim)", 3) {
      exprs =>
        expand(graft.operators.WebCuration.gopherRules(
          SparkSession.active.table(litStr(exprs(0), "table")),
          litStr(exprs(1), "id column"), litStr(exprs(2), "text column")))
    }
    registerTable("c4_clean",
      "c4_clean('table', 'idCol', 'textCol', minLineWords, minKeptLines) - C4 " +
        "(Raffel et al. 2020 §2.2) line-level cleaning: prose lines kept, " +
        "javascript/short/unpunctuated lines dropped, lorem-ipsum/brace docs dropped", 5) {
      exprs =>
        expand(graft.operators.WebCuration.c4Clean(
          SparkSession.active.table(litStr(exprs(0), "table")),
          litStr(exprs(1), "id column"), litStr(exprs(2), "text column"),
          litInt(exprs(3), "minLineWords"), litInt(exprs(4), "minKeptLines")))
    }
    registerTable("perplexity_buckets",
      "perplexity_buckets('table', 'idCol', 'textCol', 'byCol') - CCNet " +
        "(Wenzek et al. 2020) head/middle/tail terciles per byCol by add-α " +
        "bigram per-token NLL; value cutoffs from the score histogram, never " +
        "a per-group corpus rank", 4) {
      exprs =>
        expand(graft.operators.WebCuration.perplexityBuckets(
          SparkSession.active.table(litStr(exprs(0), "table")),
          litStr(exprs(1), "id column"), litStr(exprs(2), "text column"),
          litStr(exprs(3), "bucket-by column")))
    }
    registerTable("chat_render",
      "chat_render('table', 'convCol', 'ordCol', 'roleCol', 'contentCol') - " +
        "render turn records into one <|role|>content<|end|> training string " +
        "per conversation + SFT structural flags (role whitelist, opening " +
        "role, alternation, assistant-final, non-empty)", 5) {
      exprs =>
        expand(graft.operators.Chat.renderConversations(
          SparkSession.active.table(litStr(exprs(0), "table")),
          litStr(exprs(1), "conversation column"), litStr(exprs(2), "order column"),
          litStr(exprs(3), "role column"), litStr(exprs(4), "content column")))
    }

    registerTable("preference_pairs",
      "preference_pairs('table', 'promptCol', 'candCol', 'scoreCol', minMargin) - " +
        "DPO pairs: per prompt the top-scored candidate vs the bottom-scored, " +
        "kept when margin >= minMargin; ties resolve to the lowest candidate id; " +
        "ONE keyed max_by/min_by agg, never a per-prompt rank window", 5) {
      exprs =>
        expand(graft.operators.Chat.preferencePairs(
          SparkSession.active.table(litStr(exprs(0), "table")),
          litStr(exprs(1), "prompt column"), litStr(exprs(2), "candidate column"),
          litStr(exprs(3), "score column"), litLong(exprs(4), "minMargin")))
    }
    registerTable("loss_mask_spans",
      "loss_mask_spans('table', 'convCol', 'ordCol', 'roleCol', 'contentCol') - " +
        "0-based [start, end) character intervals of chat_render's rendered " +
        "string covering each assistant turn's content — the spans an SFT " +
        "trainer unmasks for the loss", 5) {
      exprs =>
        expand(graft.operators.Chat.lossMaskSpans(
          SparkSession.active.table(litStr(exprs(0), "table")),
          litStr(exprs(1), "conversation column"), litStr(exprs(2), "order column"),
          litStr(exprs(3), "role column"), litStr(exprs(4), "content column")))
    }

    // discoverability: the TVF catalog as a TVF (SHOW-FUNCTIONS-style;
    // builds at CALL time, after every registration above has run)
    registerTable("graft_functions",
      "graft_functions() - every graft table-valued function with its usage", 0) { _ =>
      val s = SparkSession.active
      import s.implicits._
      expand(tvfCatalog.sortBy(_._1).toSeq.toDF("function", "usage"))
    }

    ext.injectOptimizerRule(_ => UnitVecIdempotence)
    ext.injectOptimizerRule(_ => graft.formats.AvroProjectionPruning)
  }
}

/** `unit_vec` is idempotent: normalizing a unit vector is the identity
  * (modulo one ulp — and both sides round identically downstream), so
  * repeated normalization from composed pipeline stages folds away. */
object UnitVecIdempotence extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case UnitVector(inner @ UnitVector(_)) => inner
  }
}
