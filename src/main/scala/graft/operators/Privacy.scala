package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Privacy-audit operators — the diagnostics behind a release gate for
  * quasi-identified data, completing the anonymization story around
  * [[Relational.kAnonymize]] (the fixer): k-anonymity bounds re-identification,
  * [[lDiversityAudit]] bounds ATTRIBUTE disclosure (a k-anonymous class
  * whose sensitive value is constant still leaks it), and [[tCloseness]]
  * bounds DISTRIBUTION disclosure (a class can be diverse yet still skew
  * far from the population — Li, Li & Venkatasubramanian, ICDE 2007).
  *
  * Engine-exact contract (the [[Metrics]] conventions): every statistic
  * is an exact integer or an exact integer rational floored through the
  * pmod idiom; wide cross-multiplied products ride decimal(38,0) ⇄
  * DuckDB HUGEINT, so no result depends on aggregation order.
  */
object Privacy {

  private def dec(c: Column): Column = c.cast("decimal(38,0)")
  private def fdiv(a: Column, b: Column): Column = (a - pmod(a, b)).divide(b)

  /** l-diversity audit per equivalence class (one row per distinct
    * quasi-identifier combination): distinct l-diversity
    * (`n_distinct >= l`) and recursive (c,l)-diversity
    * (`r1 < c * (r_l + … + r_m)` with `r_i` the class's sensitive-value
    * counts in descending order — Machanavajjhala et al., TKDD 2007).
    * Both are exact integer predicates; a class with fewer than `l`
    * distinct values fails the recursive test automatically (its tail
    * sum is 0). Rows with a NULL sensitive value are excluded (no
    * attribute to disclose); NULL quasi values group as their own class
    * (both engines treat grouped NULLs as equal).
    *
    * Scale shape: corpus volume collapses ONCE into the
    * (class, sensitive-value) grain (map-side combined); the
    * descending-count rank is a window keyed on the CLASS — per-class
    * state is the class's sensitive-value universe, never corpus-sized —
    * and the finale re-aggregates that grain to class rows. Nothing
    * crosses classes; counts stay longs (class sizes, not products).
    *
    * Output per class: quasi cols, `n`, `n_distinct`, `top_count`,
    * `tail_sum` (= r_l + … + r_m), `distinct_l_ok`, `recursive_cl_ok`. */
  def lDiversityAudit(df: DataFrame, quasiCols: Seq[String],
      sensitiveCol: String, l: Int, c: Int): DataFrame = {
    require(quasiCols.nonEmpty, "at least one quasi-identifier column")
    require(l >= 2, "l >= 2 (l = 1 is vacuous)")
    require(c >= 1, "c >= 1")
    val grain = df.filter(col(sensitiveCol).isNotNull)
      .groupBy((quasiCols.map(col) :+ col(sensitiveCol).as("_v")): _*)
      .agg(count(lit(1)).as("_n"))
    val ranked = grain.withColumn("_rk", row_number().over(
      Window.partitionBy(quasiCols.map(col): _*)
        .orderBy(col("_n").desc, col("_v"))))
    ranked.groupBy(quasiCols.map(col): _*)
      .agg(sum(col("_n")).as("n"),
        count(lit(1)).as("n_distinct"),
        max(col("_n")).as("top_count"),
        sum(when(col("_rk") >= l, col("_n")).otherwise(0L)).as("tail_sum"))
      .select((quasiCols.map(col) ++ Seq(
        col("n"), col("n_distinct"), col("top_count"), col("tail_sum"),
        (col("n_distinct") >= l).as("distinct_l_ok"),
        (col("top_count") < lit(c.toLong) * col("tail_sum"))
          .as("recursive_cl_ok"))): _*)
  }

  /** t-closeness audit per equivalence class: the Earth Mover's Distance
    * between the class's sensitive-value distribution and the GLOBAL one,
    * under the ordered-distance ground metric (Li et al. 2007 §4.2):
    * `EMD = (1/(m−1)) · Σ_{i<m} |Σ_{j≤i} (p_j − q_j)|` over the global
    * ordered value universe of size m. Cross-multiplied exact: with
    * class size `n_c`, population `N`, class counts `cnt_j` and global
    * counts `g_j`, each prefix term is the integer
    * `Σ_{j≤i} (cnt_j·N − g_j·n_c)`, so
    * `t_micro = 10⁶·Σ|prefix| // ((m−1)·n_c·N)` is an exact floor.
    * A single-value universe (m = 1) reports 0 (all distributions
    * coincide). NULL sensitive values are excluded.
    *
    * Scale shape: the corpus collapses ONCE into the (class, value)
    * grain; the global value table and its total are model-sized and
    * broadcast; the dense class × value matrix (every class needs a row
    * for every GLOBAL value — absent values still move mass) is
    * classes·m rows, and the prefix sum is a window keyed on the class
    * with per-class state = m. Products reach n² — decimal(38,0), and
    * the summed numerator reaches m·n²: past ~10¹⁵ rows with a
    * thousand-value universe the decimal saturates — far beyond any
    * single table this engine targets.
    *
    * Output per class: quasi cols, `n`, `t_micro`. */
  def tCloseness(df: DataFrame, quasiCols: Seq[String],
      sensitiveCol: String): DataFrame = {
    require(quasiCols.nonEmpty, "at least one quasi-identifier column")
    val base = graft.CacheScope.track(
      df.filter(col(sensitiveCol).isNotNull)
        .groupBy((quasiCols.map(col) :+ col(sensitiveCol).as("_v")): _*)
        .agg(count(lit(1)).as("_cnt"))
        .cache())
    val global = base.groupBy(col("_v")).agg(sum(col("_cnt")).as("_g"))
    val tot = global.agg(sum(col("_g")).as("_N"),
      count(lit(1)).as("_m"))
    val classes = base.groupBy(quasiCols.map(col): _*)
      .agg(sum(col("_cnt")).as("_nc"))
    val matrix = classes
      .crossJoin(broadcast(global))
      .crossJoin(broadcast(tot))
      .join(base, quasiCols :+ "_v", "left")
      .select((quasiCols.map(col) ++ Seq(col("_v"), col("_nc"), col("_N"),
        col("_m"),
        (dec(coalesce(col("_cnt"), lit(0L))) * dec(col("_N")) -
          dec(col("_g")) * dec(col("_nc"))).as("_d"))): _*)
    val prefixed = matrix.withColumn("_pre", sum(col("_d")).over(
      Window.partitionBy(quasiCols.map(col): _*).orderBy(col("_v"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    prefixed.groupBy(quasiCols.map(col): _*)
      .agg(max(col("_nc")).as("n"), max(col("_N")).as("_N"),
        max(col("_m")).as("_m"), sum(abs(col("_pre"))).as("_num"))
      .select((quasiCols.map(col) ++ Seq(col("n"),
        when(col("_m") > 1,
          fdiv(dec(lit(1000000L)) * col("_num"),
            dec(col("_m") - lit(1L)) * dec(col("n")) * dec(col("_N")))
            .cast("long"))
          .otherwise(0L).as("t_micro"))): _*)
  }
}
