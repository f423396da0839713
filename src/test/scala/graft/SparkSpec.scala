package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for specs. `getOrCreate` means all suites in the
  * forked test JVM share one session. */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    // tz-less parquet timestamps (timestamp[us] with no tz, as the
    // driver-generated testdata now carries) read as TIMESTAMP, not
    // TIMESTAMP_NTZ: one instant line under the UTC session zone,
    // matching DuckDB's naive-as-UTC oracle reading
    .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    .config("spark.ui.enabled", "false")
    .appName("graft-test")
    .getOrCreate()

  /** Smallest SF — specs verify semantics, not scale. */
  val sf = "/root/testdata/sf0.001"
}
