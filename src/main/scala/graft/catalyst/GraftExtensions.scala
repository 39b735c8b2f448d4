package graft.catalyst

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

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
