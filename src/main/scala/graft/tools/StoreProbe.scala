package graft.tools

import graft.zarr.{SerializableHadoopConf, ZarrStore}

/** Throwaway-style micro-probe for ZarrStore small-object write cost —
  * bisects the per-call overhead the HCS ingest task timing surfaced
  * (~50 ms per tiny write inside executor tasks). Not wired into any
  * bench or gate; safe to run ad hoc: runMain graft.tools.StoreProbe
  */
object StoreProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").appName("store-probe")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = java.nio.file.Files.createTempDirectory("storeprobe").toString
    val hconf = Some(SerializableHadoopConf.fromActiveSession())
    val n = 200

    // A: one store, n writes
    val stA = new ZarrStore(s"$dir/a", hconf)
    var t0 = System.nanoTime()
    (0 until n).foreach(i => stA.writeString(s"sub$i/.zattrs", "{\"k\":1}"))
    println(f"A one-store driver writes: ${(System.nanoTime() - t0) / 1e6 / n}%.2f ms/write")

    // B: new store per write (the hcsIngest shape)
    t0 = System.nanoTime()
    (0 until n).foreach { i =>
      new ZarrStore(s"$dir/b/sub$i", hconf).writeString(".zattrs", "{\"k\":1}")
    }
    println(f"B store-per-write driver:  ${(System.nanoTime() - t0) / 1e6 / n}%.2f ms/write")

    // C: inside an executor task (the real context)
    import spark.implicits._
    val d2 = dir
    val times = spark.range(4).as[Long].mapPartitions { it =>
      val st = new ZarrStore(s"$d2/c", hconf)
      it.map { p =>
        val t = System.nanoTime()
        (0 until n).foreach(i => st.writeString(s"p$p/sub$i/.zattrs", "{\"k\":1}"))
        (System.nanoTime() - t) / 1e6 / n
      }
    }.collect()
    println(f"C one-store in-task:       ${times.sum / times.length}%.2f ms/write")

    // E: raw Hadoop local FS with setPermission no-op'd — isolates the
    // per-create chmod fork RawLocalFileSystem does without libhadoop
    val raw = new org.apache.hadoop.fs.RawLocalFileSystem() {
      override def setPermission(p: org.apache.hadoop.fs.Path,
          perm: org.apache.hadoop.fs.permission.FsPermission): Unit = ()
    }
    raw.initialize(new java.net.URI("file:///"),
      spark.sparkContext.hadoopConfiguration)
    t0 = System.nanoTime()
    (0 until n).foreach { i =>
      val out = raw.create(new org.apache.hadoop.fs.Path(s"$dir/e/sub$i/.zattrs"), true)
      out.write("{\"k\":1}".getBytes("UTF-8")); out.close()
    }
    println(f"E no-chmod raw local FS:   ${(System.nanoTime() - t0) / 1e6 / n}%.2f ms/write")

    // F: stock RawLocalFileSystem for the same writes (fork included)
    val rawStock = new org.apache.hadoop.fs.RawLocalFileSystem()
    rawStock.initialize(new java.net.URI("file:///"),
      spark.sparkContext.hadoopConfiguration)
    t0 = System.nanoTime()
    (0 until n).foreach { i =>
      val out = rawStock.create(new org.apache.hadoop.fs.Path(s"$dir/f/sub$i/.zattrs"), true)
      out.write("{\"k\":1}".getBytes("UTF-8")); out.close()
    }
    println(f"F stock raw local FS:      ${(System.nanoTime() - t0) / 1e6 / n}%.2f ms/write")

    // G: the engine's refined NoChmod FS (r13: skips only
    // default-permission setPermission calls) — must land at E's
    // cost, not F's; a raw (unmasked) default permission reaching
    // setPermission here would silently reintroduce the fork
    val tuned = new graft.zarr.NoChmodRawLocalFileSystem()
    tuned.initialize(new java.net.URI("file:///"),
      spark.sparkContext.hadoopConfiguration)
    t0 = System.nanoTime()
    (0 until n).foreach { i =>
      val out = tuned.create(new org.apache.hadoop.fs.Path(s"$dir/g/sub$i/.zattrs"), true)
      out.write("{\"k\":1}".getBytes("UTF-8")); out.close()
    }
    println(f"G refined no-chmod FS:     ${(System.nanoTime() - t0) / 1e6 / n}%.2f ms/write")

    val times2 = spark.range(4).as[Long].mapPartitions { it =>
      it.map { p =>
        val t = System.nanoTime()
        (0 until n).foreach(i =>
          new ZarrStore(s"$d2/d/p$p/sub$i", hconf).writeString(".zattrs", "{\"k\":1}"))
        (System.nanoTime() - t) / 1e6 / n
      }
    }.collect()
    println(f"D store-per-write in-task: ${times2.sum / times2.length}%.2f ms/write")
    spark.stop()
  }
}
