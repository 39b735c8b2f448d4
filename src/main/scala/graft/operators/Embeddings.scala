package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Embedding-column utilities beyond similarity search — the storage /
  * shipping side of a training-data pipeline.
  */
object Embeddings {

  /** Symmetric per-vector int8 quantization: `scale = max|v| / 127`,
    * `code_i = round(v_i / scale)` — the standard embedding-compression
    * step before shipping vectors to an ANN index or training job (4-8×
    * smaller than float32, reconstruction `code_i * scale`).
    *
    * Per-row, linear, no shuffle: quantization is a projection and scales
    * embarrassingly. Every emitted column is IEEE-deterministic arithmetic
    * on exact inputs (no rounding ties: `scale` is one double division,
    * `max_err` a max over identical double ops), so the whole output is
    * hash-checkable cross-engine — gate q57 replays it in DuckDB list
    * algebra. `q_sum` is the integer checksum of all codes: it pins every
    * individual code without shipping the code arrays through the oracle
    * compare. By construction |v_i|/scale <= 127, so codes need no clamp.
    */
  def quantizeInt8(emb: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val v = col(vecCol).cast("array<double>")
    def codeOf(x: Column): Column = round(x / col("_scale")).cast("long")
    emb
      .select(col(idCol), v.as("_v"))
      .withColumn("_scale", array_max(transform(col("_v"), x => abs(x))) / lit(127.0))
      .select(
        col(idCol),
        size(col("_v")).as("n_dims"),
        col("_scale").as("scale"),
        when(col("_scale") === 0, lit(0L))
          .otherwise(aggregate(transform(col("_v"), x => codeOf(x)), lit(0L), (acc, q) => acc + q))
          .as("q_sum"),
        when(col("_scale") === 0, lit(0.0))
          .otherwise(array_max(transform(col("_v"),
            x => abs(x - codeOf(x).cast("double") * col("_scale")))))
          .as("max_err"))
  }
}
