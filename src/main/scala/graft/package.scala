package object graft {
  /** A named query: (session, data dir) => result frame. Matches the
    * driver contract in SparkEntry.queries. */
  type Q = (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame
}
