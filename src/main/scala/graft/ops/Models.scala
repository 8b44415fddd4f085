package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Model persistence and transport (S11 + F25). The reference serializes
  * fitted models with joblib to a binary file
  * (`/root/reference/dags/forecasting_dag.py:237-238` model sink) and ships
  * them between Airflow tasks base64-encoded in XCom
  * (`/root/reference/dags/forecasting_dag.py:187-204` — `joblib.dump` +
  * `b64encode`, then `b64decode` + `joblib.load`). Engine-native, a "model" is
  * what it always was underneath: a small PARAMETER TABLE. Persistence is
  * a parquet sink/source; transport is a canonical per-row payload —
  * printf-formatted JSON, base64-encoded — that any engine reproduces
  * byte-identically (the DuckDB oracle builds the same base64 from the
  * same printf).
  *
  * Scale notes: a parameter table is broadcast-sized by construction; the
  * round-trip never touches the driver (encode/decode are codegen'd
  * expressions), so shipping a model to 1000 executors is one broadcast,
  * not 1000 file reads.
  */
object Models {

  /** S11 sink: persist a parameter table as the model artifact. */
  def saveModel(params: DataFrame, path: String): Unit =
    params.write.mode("overwrite").parquet(path)

  /** S11 source: load a persisted model's parameter table. */
  def loadModel(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** F25 encode: one transport payload per parameter row —
    * `{"param":"<key>","mu":<%.6f>,"sigma":<%.6f>}` base64-encoded.
    * printf formatting (not engine-default double rendering) pins the
    * payload bytes across engines; values are `round(x, 6)`-ed FIRST so
    * an exact 7-digit dyadic tie (e.g. 2⁻⁷ = 0.0078125) can't hit the
    * formatter's rounding step, where Java (HALF_UP) and C printf
    * (half-even) disagree. NaN/NULL values (stddev of a 1-row group is
    * NaN in Spark, NULL in SQL engines) are normalized to JSON null so
    * the payload stays valid JSON and both engines emit identical bytes.
    * The key is emitted through `to_json` (Jackson escaping) so a key
    * containing `"` / `\` / control characters still yields valid JSON
    * that [[fromTransport]] decodes losslessly; for clean keys the bytes
    * are identical to the raw printf form, so oracle parity is unchanged.
    */
  def toTransport(params: DataFrame, keyCol: String, muCol: String,
                  sigmaCol: String): DataFrame = {
    def jsonNum(c: Column): Column =
      when(c.isNull || isnan(c), lit("null"))
        .otherwise(format_string("%.6f", round(c, 6)))
    // {"param":"<escaped key>"} minus the closing brace. A NULL key needs
    // its own branch: to_json drops null struct fields (ignoreNullFields),
    // so stripping the brace of "{}" would yield "{" and a malformed
    // payload — emit the explicit JSON null instead.
    val keyJson = to_json(struct(col(keyCol).as("param")))
    val keyPart = when(col(keyCol).isNull, lit("""{"param":null"""))
      .otherwise(keyJson.substr(lit(1), length(keyJson) - 1))
    params.select(col(keyCol).as("param"),
      base64(concat(keyPart,
        format_string(""","mu":%s,"sigma":%s}""",
          jsonNum(col(muCol)), jsonNum(col(sigmaCol)))).cast("binary"))
        .as("payload_b64"))
  }

  /** F25 decode: recover the parameters from a transport payload. */
  def fromTransport(payloads: DataFrame, b64Col: String): DataFrame =
    payloads
      .withColumn("__json", unbase64(col(b64Col)).cast("string"))
      .select(col(b64Col),
        get_json_object(col("__json"), "$.param").as("param"),
        get_json_object(col("__json"), "$.mu").cast("double").as("mu"),
        get_json_object(col("__json"), "$.sigma").cast("double").as("sigma"))

  /** Deterministic md5-derived demo weights (the LSH-hyperplane recipe
    * with a `wgt_` prefix): one row, `w` = `dims` components in [-1, 1).
    * Any engine reproduces them from the recipe, which is what makes
    * [[scoreLinear]]'s output exactly oracle-checkable.
    */
  def md5Weights(spark: SparkSession, tag: String, dims: Int): DataFrame = {
    import spark.implicits._
    Seq((0 until dims).map { d =>
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"wgt_${tag}_$d".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 15)
      (java.lang.Long.parseLong(hex, 16) % 2000001L - 1000000L) / 1000000.0
    }.toArray).toDF("w")
  }

  /** Batch model scoring — the executor-side shape of every "run the
    * classifier over the corpus" job: score = σ(w·v + b) over a vector
    * column, weights as a BROADCAST one-row table (data, not literal
    * plan nodes — the LSH-planes rule). The w·v kernel is the native
    * codegen'd [[graft.functions.DotProduct]] (`dot_prod`) — one fused
    * loop per row instead of the interpreted `aggregate(zip_with(...))`
    * fold's two lambda dispatches per component; the HOF spelling it
    * replaced is kept bit-identical by DotProductSpec, and both
    * accumulate left-to-right like DuckDB's `list_dot_product`, so the
    * oracle is unchanged. `predicted` is derived from the ROUNDED score
    * (`round(σ(z),6) > 0.5`): the raw margin's sign depends on float
    * summation ORDER when |z| is within a few ulps of 0 (Spark folds
    * sequentially, another engine may not), while the round(…,6)
    * boundary is deterministic on both sides — a margin that tiny
    * rounds σ(z) to exactly 0.500000, which both engines classify
    * false.
    *
    * Malformed vectors (dimension mismatch vs the weight table, or null
    * elements) score NULL — the detectable data-quality signal the HOF
    * fold gave for free via null propagation; the native kernel would
    * otherwise silently score the common prefix. Requires the session to
    * carry [[graft.GraftExtensions]] (`Graft.session` does) for
    * `dot_prod`.
    */
  def scoreLinear(emb: DataFrame, idCol: String, vecCol: String,
                  extraCols: Seq[String], weights: DataFrame,
                  bias: Double): DataFrame = {
    Par.requireKernel(emb.sparkSession, "dot_prod")
    val v = transform(col(vecCol), x => x.cast("double"))
    Par.ensure(emb)
      .select((col(idCol) +: extraCols.map(col)) :+ v.as("__v"): _*)
      .crossJoin(broadcast(weights))
      .withColumn("__z",
        when(size(col("__v")) === size(col("w")) &&
          !exists(col("__v"), _.isNull),
          call_function("dot_prod", col("__v"), col("w")) + bias))
      .withColumn("score", round(lit(1.0) / (lit(1.0) + exp(-col("__z"))), 6))
      .select((col(idCol) +: extraCols.map(col)) ++ Seq(
        col("score"), (col("score") > 0.5).as("predicted")): _*)
      .orderBy(idCol)
  }

  /** The F25 round trip as one queryable surface: fit a standardizer-style
    * model (per-group mean/std), encode, decode — emitting both the wire
    * payload and the decoded parameters so an oracle can verify the
    * payload bytes AND that decode∘encode is the printf-rounded identity.
    */
  def transportRoundTrip(df: DataFrame, keyCol: String,
                         valCol: String): DataFrame = {
    val params = df.groupBy(col(keyCol).as("param"))
      .agg(avg(col(valCol)).as("mu"), stddev_samp(col(valCol)).as("sigma"))
    val encoded = toTransport(params, "param", "mu", "sigma")
    fromTransport(encoded, "payload_b64")
      .select(col("param"), col("payload_b64"), col("mu"), col("sigma"))
      .orderBy("param")
  }
}
