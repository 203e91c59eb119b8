package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** IO/shuffle-bound host-disposition CONTROL (bench key
  * `x_ioshuffle4m`): a fixed-size workload whose cost is almost
  * entirely shuffle + parquet write + parquet read, with negligible
  * compute — the complement of the CPU-bound ccl/edt/bpe controls.
  *
  * Why it exists: round 11's final bench read all three CPU controls
  * healthy (disposition 1.056) while four IO/shuffle-heavy rehearsal
  * keys (t_dedup200k_skew, h_plate384, t_crawl200k, the collapsed
  * skew twin) spiked 2.2–4.3× their same-code pins — a host IO
  * episode the CPU controls are structurally blind to. This key
  * closes that attribution blind spot: when it reads >~2× its pin,
  * IO-heavy rehearsal spikes in the same run attribute to host IO
  * disposition; when it reads healthy, an IO-key spike is a real
  * plan/regression signal.
  *
  * The workload, deterministic end to end:
  *   1. generate n rows (id, bucket, 64-hex-char payload) from a
  *      splitmix64 position hash — distributed, no driver arrays;
  *   2. repartition by bucket — a full ~80 B/row shuffle;
  *   3. write parquet to a scratch dir (incompressible payload, so
  *      bytes on disk track bytes generated);
  *   4. read back and verify EVERY row's payload against its
  *      recomputed hash (count of mismatches must be 0) plus exact
  *      closed-form id-sum/count — content-exact, one read pass.
  *
  * Scratch lives under java.io.tmpdir and is deleted best-effort; a
  * leaked dir from a crashed run costs disk, never correctness.
  */
object IoControlRehearsal {

  /** splitmix64 finalizer — same family as the other rehearsals. */
  def mix(i: Long): Long = {
    var z = i + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** 64 hex chars from four chained mixes of the id — incompressible
    * enough that parquet/snappy can't shrink the IO under test.
    */
  def payloadAt(id: Long): String = {
    val sb = new java.lang.StringBuilder(64)
    var h = mix(id)
    var k = 0
    while (k < 4) {
      val hex = java.lang.Long.toHexString(h)
      var pad = 16 - hex.length
      while (pad > 0) { sb.append('0'); pad -= 1 }
      sb.append(hex)
      h = mix(h)
      k += 1
    }
    sb.toString
  }

  def run(spark: SparkSession, n: Long = 4000000L, buckets: Int = 1024): Double = {
    import spark.implicits._
    val t0 = System.nanoTime()
    val dir = java.nio.file.Files.createTempDirectory("io_control").toString
    try {
      val rows = spark.range(n).map { id =>
        (id, (mix(id) & Long.MaxValue) % buckets, payloadAt(id))
      }.toDF("id", "bucket", "payload")
      rows.repartition(col("bucket"))
        .write.mode("overwrite").parquet(dir)

      val back = spark.read.parquet(dir)
      val badPayload = udf((id: Long, p: String) => p != payloadAt(id))
      val agg = back.agg(
        count(lit(1)).as("cnt"),
        sum(col("id")).as("idsum"),
        sum(when(badPayload(col("id"), col("payload")), 1L).otherwise(0L)).as("bad")
      ).head()
      require(agg.getLong(0) == n, s"io control: count ${agg.getLong(0)} != $n")
      require(agg.getLong(1) == n * (n - 1) / 2,
        s"io control: id-sum ${agg.getLong(1)} != ${n * (n - 1) / 2}")
      require(agg.getLong(2) == 0L, s"io control: ${agg.getLong(2)} corrupted payloads")
      (System.nanoTime() - t0) / 1e9
    } finally {
      // best-effort recursive cleanup of the scratch dir
      def rm(f: java.io.File): Unit = {
        val kids = f.listFiles()
        if (kids != null) kids.foreach(rm)
        f.delete(); ()
      }
      rm(new java.io.File(dir))
    }
  }
}
