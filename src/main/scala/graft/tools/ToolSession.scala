package graft.tools

import org.apache.spark.sql.SparkSession

/** Shared session builder for the dev tools (Explain, PlanAudit). */
object ToolSession {

  /** 1-minute system load average, -1.0 when the platform can't report
    * it — the contended-run stamp both Bench and ScalingProbe write into
    * their artifacts (one definition so the stamps can never diverge).
    * JSON-safe: the MXBean returns NaN on some platforms.
    */
  def loadAvg1: Double = {
    val l = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage
    if (l.isNaN) -1.0 else math.rint(l * 100) / 100
  }
  def local(): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
