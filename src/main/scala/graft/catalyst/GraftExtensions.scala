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
    def register(name: String, usage: String)(builder: Seq[Expression] => Expression): Unit =
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft.catalyst.GraftExtensions", null, name, usage, ""),
        builder))

    register("simhash64", "simhash64(tokens) - 64-bit SimHash of a string array") {
      exprs => SimHash64(exprs.head)
    }
    register("dot_d", "dot_d(a, b) - dot product of two double arrays") {
      exprs => DotProductD(exprs(0), exprs(1))
    }
    register("unit_vec", "unit_vec(v) - L2-normalize a float/double array to unit double array") {
      exprs => UnitVector(exprs.head)
    }
    register("hyperplane_sketch",
      "hyperplane_sketch(v, nBits[, seed]) - signed random-hyperplane LSH sketch") {
      exprs => HyperplaneSketch64(exprs.head, litInt(exprs(1), "nBits"),
        if (exprs.length > 2) litLong(exprs(2), "seed") else 42L)
    }
    register("shingle_hashes",
      "shingle_hashes(tokens, n) - sorted distinct 64-bit hashes of word n-gram shingles") {
      exprs => ShingleHashes(exprs.head, litInt(exprs(1), "n"))
    }
    register("minhash_sig",
      "minhash_sig(shingleHashes, numPerms[, seed]) - MinHash signature array") {
      exprs => MinHashSig(exprs.head, litInt(exprs(1), "numPerms"),
        if (exprs.length > 2) litLong(exprs(2), "seed") else 42L)
    }
    register("intersect_count_sorted",
      "intersect_count_sorted(a, b) - |A∩B| of two sorted distinct long arrays") {
      exprs => IntersectCountSorted(exprs(0), exprs(1))
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
