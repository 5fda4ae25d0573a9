package graft

import org.apache.spark.sql.SparkSession

/** Library entry point for users bootstrapping their own cluster session
  * (the driver harness instead hands SparkEntry an already-built session
  * and goes through the same `attach`).
  *
  *  - [[builder]]: a SparkSession.Builder preloaded with the engine's
  *    required settings — UTC semantics, the TIMESTAMP(NANOS) parquet
  *    read flag, and the SparkSessionExtensions hook that injects the
  *    native functions (graft_vecdot, graft_minhash_sig) at session
  *    build, the standard `spark.sql.extensions` deployment path.
  *  - [[attach]]: apply the same settings to an EXISTING session (e.g.
  *    one provided by a notebook or job server, where the extensions
  *    class can no longer be injected — functions are registered
  *    directly instead). Idempotent.
  */
object GraftSession {

  def builder(): SparkSession.Builder =
    SparkSession.builder()
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", classOf[functions.GraftExtensions].getName)

  def attach(s: SparkSession): SparkSession = {
    s.conf.set("spark.sql.session.timeZone", "UTC")
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    functions.GraftFunctions.register(s)
    s
  }
}
