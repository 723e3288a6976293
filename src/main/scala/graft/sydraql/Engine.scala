package graft.sydraql

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Per-stage timings in microseconds, mirroring the reference's query stats
  * object (`/root/reference/src/sydra/query/exec.zig:48-58`,
  * `http.zig:335-395`).
  */
final case class QueryStats(
    parseUs: Long,
    validateUs: Long,
    compileUs: Long,
    traceId: String)

final case class QueryResult(df: DataFrame, stats: QueryStats)

/** sydraQL execution pipeline: parse → validate → compile → DataFrame
  * (`exec.execute`, `/root/reference/src/sydra/query/exec.zig:14-61`; the
  * plan/optimize/physical stages dissolve into Catalyst).
  */
object Engine {

  private val rng = new java.security.SecureRandom()
  private def traceId(): String = {
    val alphabet = "abcdefghijklmnopqrstuvwxyz234567"
    (0 until 13).map(_ => alphabet(rng.nextInt(32))).mkString
  }

  /** Execute sydraQL text against a series source DataFrame (columns:
    * series, series_id, tags, time, value).
    */
  def execute(
      spark: SparkSession,
      source: DataFrame,
      sydraql: String,
      options: CompileOptions = CompileOptions()): QueryResult = {
    val t0 = System.nanoTime()
    val ast = Parser.parse(sydraql)
    val t1 = System.nanoTime()
    Validator.validate(ast)
    val t2 = System.nanoTime()
    val df = new Compiler(spark, source, options).compile(ast)
    val t3 = System.nanoTime()
    QueryResult(df, QueryStats(
      parseUs = (t1 - t0) / 1000,
      validateUs = (t2 - t1) / 1000,
      compileUs = (t3 - t2) / 1000,
      traceId = traceId()))
  }

  /** Convenience: DataFrame only. */
  def sql(spark: SparkSession, source: DataFrame, sydraql: String,
      options: CompileOptions = CompileOptions()): DataFrame =
    execute(spark, source, sydraql, options).df
}
