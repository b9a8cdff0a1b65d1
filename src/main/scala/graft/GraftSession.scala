package graft

import org.apache.spark.sql.SparkSession

/** User-facing session bootstrap — the engine's `EngineSession` (SURVEY
  * §7 M1): one call gives a SparkSession with the Hive-gap functions, the
  * graft optimizer rule, UTC session time, AQE (incl. skew join), and
  * sane local-mode shuffle parallelism. A reference (Hive 1.2) user's
  * entry point: `val spark = GraftSession.local(); spark.sql(...)`.
  */
object GraftSession {

  /** Builder preloaded with the graft extensions + recommended confs;
    * callers add master/app/warehouse and build. */
  def builder(): SparkSession.Builder =
    SparkSession.builder()
      .withExtensions(new GraftExtensions())
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")

  /** Local session sized to the machine (shuffle partitions = cores, not
    * the 200 default that fragments small-cluster runs). */
  def local(cores: Int = Runtime.getRuntime.availableProcessors()): SparkSession = {
    val s = builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    Functions.register(s) // idempotent; covers a reused pre-built session
    s
  }

  /** Session + the driver testdata registered as tables — the quickest
    * path to `spark.sql("SELECT ... FROM lineitem")`. */
  def localWithTables(dir: String): SparkSession = {
    val s = local()
    Tables.register(s, dir)
    s
  }
}
