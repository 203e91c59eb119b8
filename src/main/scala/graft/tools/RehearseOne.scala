package graft.tools

import org.apache.spark.sql.SparkSession

/** Standalone rehearsal runner for perf attribution: runs ONE bench
  * rehearsal key in a fresh JVM/session (no 132-query suite ahead of
  * it) so a tail-context reading can be separated from a real plan
  * regression. `runMain graft.tools.RehearseOne <key> [n] [boiler]`
  * with key ∈ dedup | dedup_skew | dedup_skew_collapsed | ann |
  * pyramid | pyramid_gauss | crawl | imgdedup | decon | ccl | edt |
  * fill | kcore | bpe | hcs | cov | dicom | ioctl.
  */
object RehearseOne {
  def main(args: Array[String]): Unit = {
    val key = if (args.nonEmpty) args(0) else "dedup_skew"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-rehearse-one")
      .config(graft.zarr.SparkSessions.tunedLocalFs._1, graft.zarr.SparkSessions.tunedLocalFs._2)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    val secs = key match {
      case "dedup" =>
        graft.ops.DedupRehearsal.run(spark,
          if (args.length > 1) args(1).toLong else 200000L)
      case "dedup_skew" =>
        graft.ops.DedupRehearsal.run(spark,
          if (args.length > 1) args(1).toLong else 200000L,
          boilerplate = if (args.length > 2) args(2).toLong else 3000L)
      case "dedup_skew_collapsed" =>
        graft.ops.DedupRehearsal.runCollapsed(spark,
          if (args.length > 1) args(1).toLong else 200000L,
          boilerplate = if (args.length > 2) args(2).toLong else 3000L)
      case "ann" =>
        graft.ops.AnnRehearsal.run(spark,
          if (args.length > 1) args(1).toLong else 1000000L)
      case "pyramid" =>
        graft.operators.PyramidRehearsal.run(spark)
      case "pyramid_gauss" =>
        graft.operators.PyramidRehearsal.run(spark,
          method = graft.meta.Model.Method.ItkwasmGaussian)
      case "crawl" =>
        graft.sources.CrawlRehearsal.run(spark,
          if (args.length > 1) args(1).toLong else 200000L,
          if (args.length > 2) args(2).toInt else 64)
      case "imgdedup" =>
        graft.ops.ImgDedupRehearsal.run(spark,
          if (args.length > 1) args(1).toLong else 1000000L,
          if (args.length > 2) args(2).toLong else 10000L)
      case "decon" =>
        graft.ops.DeconRehearsal.run(spark,
          if (args.length > 1) args(1).toLong else 200000L,
          if (args.length > 2) args(2).toLong else 1000L)
      case "ccl" =>
        graft.operators.CclRehearsal.run(spark,
          if (args.length > 1) args(1).toInt else 4096)
      case "edt" =>
        graft.operators.EdtRehearsal.run(spark,
          if (args.length > 1) args(1).toInt else 4096)
      case "fill" =>
        graft.operators.FillRehearsal.run(spark,
          if (args.length > 1) args(1).toInt else 4096)
      case "kcore" =>
        graft.ops.KcoreRehearsal.run(spark,
          if (args.length > 1) args(1).toLong else 1000000L)
      case "bpe" =>
        graft.ops.BpeRehearsal.run(spark,
          if (args.length > 1) args(1).toLong else 200000L,
          if (args.length > 2) args(2).toInt else 1000)
      case "hcs" =>
        graft.hcs.HcsRehearsal.run(spark)
      case "dicom" =>
        graft.operators.DicomRehearsal.run(spark,
          if (args.length > 1) args(1).toInt else 256)
      case "cov" =>
        graft.ops.CovRehearsal.run(spark,
          if (args.length > 1) args(1).toLong else 1000000L,
          if (args.length > 2) args(2).toInt else 256)
      case "ioctl" =>
        graft.tools.IoControlRehearsal.run(spark,
          if (args.length > 1) args(1).toLong else 4000000L)
      case other => sys.error(s"unknown rehearsal key '$other'")
    }
    println(f"""{"rehearsal":"$key","sec":$secs%.3f}""")
    spark.stop()
  }
}
