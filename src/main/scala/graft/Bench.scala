package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark: times every registered query on
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line. Queries execute
  * end-to-end into the noop sink so sorts/limits aren't optimized
  * away the way a bare count() would allow.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // warm the JVM + parquet footers once so timings measure the
    // queries, not first-touch class loading
    Tables.names.foreach(n => Tables.load(spark, sfDir, n).count())

    val results = SparkEntry.all.map { q =>
      val t0 = System.nanoTime()
      try q.run(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] ${q.name} failed: ${e.getMessage}")
      }
      val dt = (System.nanoTime() - t0) / 1e9
      // drop per-query persisted state so queries don't pay for each
      // other's cached blocks
      spark.catalog.clearCache()
      q.name -> dt
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val headlineNames = SparkEntry.headline.map(_.name).toSet
    val headlineTotal = results.collect { case (k, v) if headlineNames(k) => v }.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","headline_sec":$headlineTotal,"queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
