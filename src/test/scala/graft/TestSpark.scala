package graft

import org.apache.spark.sql.SparkSession

/** One SparkSession for the whole test run (suites run serially). */
object TestSpark {
  lazy val warehouse: String = {
    val d = java.nio.file.Files.createTempDirectory("graft-wh").toString
    d
  }
  lazy val cacheDir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft-cache").toString
    CacheConfig.current = CacheConfig(sparkCacheDir = d + "/")
    d + "/"
  }
  lazy val spark: SparkSession = {
    val _ = cacheDir // force config init before any caching call
    val s = SparkSession
      .builder()
      .master("local[4]")
      .appName("graft-test")
      .withExtensions(new graft.functions.GraftSparkExtensions)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", warehouse)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val sf0001 = "/root/testdata/sf0.001"
  val sf001 = "/root/testdata/sf0.01"
}
