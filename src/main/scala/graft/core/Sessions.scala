package graft.core

import org.apache.spark.sql.SparkSession

/** Session factory for the graft engine.
  *
  * Defaults are chosen for a 1000-executor cluster mindset tested on
  * `local[32]`: AQE on (runtime coalesce + skew-join handling),
  * shuffle partitions sized to the local core count rather than the
  * 200 default, UTC session time zone (the reference stores KST
  * wall-clock timestamps by *adding* 9h explicitly — see
  * `/root/reference/Talent_Opportunity_Platform/log_screen.py:299` —
  * never by changing the session zone).
  */
object Sessions {
  def local(cores: Int = 32, appName: String = "graft"): SparkSession = {
    val builder = SparkSession
      .builder()
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.cbo.enabled", "true")
      .config("spark.sql.cbo.planStats.enabled", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
    val spark = applyExtraConf(builder).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  /** Operational conf overrides without a rebuild:
    * `GRAFT_EXTRA_CONF="spark.sql.cbo.joinReorder.enabled=true"`
    * (semicolon-separated k=v pairs) — the gated optimizer-A/B lever,
    * shared by every session builder that honors it. */
  def applyExtraConf(builder: SparkSession.Builder): SparkSession.Builder = {
    sys.env.get("GRAFT_EXTRA_CONF").toSeq
      .flatMap(_.split(";")).map(_.trim).filter(_.contains("="))
      .foreach { kv =>
        val Array(k, v) = kv.split("=", 2)
        builder.config(k, v): Unit
      }
    builder
  }
}
