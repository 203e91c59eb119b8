package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Shards — deterministic training-shard layout: plan stability under
  * partitioning, balanced assignment, and the parquet writer
  * round-trip (shard directories on disk match the plan exactly).
  */
class ShardsSpec extends SparkSpec {

  import spark.implicits._

  test("shard plan is a pure function of ids (stable under repartition)") {
    val df = (0L until 1000L).toDF("doc_id")
    def planOf(d: org.apache.spark.sql.DataFrame) =
      Shards.shardPlan(d, nShards = 8).select("doc_id", "shard", "pos")
        .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2)))).toMap
    val a = planOf(df)
    val b = planOf(df.repartition(17))
    assert(a == b)
    // positions within a shard are a contiguous 1..n ranking
    val byShard = a.values.groupBy(_._1)
    assert(byShard.keySet == (0 until 8).toSet)
    byShard.values.foreach { g =>
      assert(g.map(_._2).toList.sorted == (1L to g.size).toList)
    }
    // hash balance: no shard more than 2x the mean at 1000 rows
    assert(byShard.values.map(_.size).max < 2 * 1000 / 8)
  }

  test("writeShards round-trips: shard dirs match the plan, order preserved") {
    val df = (0L until 300L).toDF("doc_id")
      .withColumn("text", concat(lit("doc"), col("doc_id")))
    val path = java.nio.file.Files.createTempDirectory("shards").toString + "/out"
    Shards.writeShards(df, path, nShards = 4)
    val back = spark.read.parquet(path)
    assert(back.count() == 300)
    val plan = Shards.shardPlan(df, nShards = 4)
      .select("doc_id", "shard", "pos").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val got = back.select(col("doc_id"), col("shard").cast("int"), col("pos"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(got == plan)
    // payload columns survive
    assert(back.filter(col("doc_id") === 7L).select("text").head.getString(0) == "doc7")
    // physical layout: one directory per shard
    val dirs = new java.io.File(path).listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("shard=")).sorted
    assert(dirs.toSeq == (0 until 4).map(i => s"shard=$i"))
  }

  test("tar shards round-trip in plan order, byte-deterministically") {
    import spark.implicits._
    val df = (0L until 120L).map(i => (i, s"document number $i " + "x" * (i % 40).toInt))
      .toDF("doc_id", "text")
    val hconf = graft.zarr.SerializableHadoopConf.fromActiveSession()
    val dirA = java.nio.file.Files.createTempDirectory("tarA").toString
    val dirB = java.nio.file.Files.createTempDirectory("tarB").toString
    Shards.writeTarShards(df, dirA, nShards = 4)
    Shards.writeTarShards(df, dirB, nShards = 4)
    val plan = Shards.shardPlan(df, nShards = 4)
      .select("doc_id", "shard", "pos").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val byShard = plan.groupBy(_._2)
    (0 until 4).foreach { k =>
      val pa = f"$dirA/shard-$k%05d.tar"
      // reproducible-build: both writes byte-identical
      val a = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(pa))
      val b = java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(f"$dirB/shard-$k%05d.tar"))
      assert(java.util.Arrays.equals(a, b), s"shard $k not deterministic")
      assert(a.length % 512 == 0)
      // members stream in plan order with plan names and exact text
      val members = Shards.readTarShard(pa, hconf).toList
      val expect = byShard(k).sortBy(_._3)
      assert(members.map(_._1) ===
        expect.map { case (id, _, pos) => f"$pos%09d.$id.txt" }.toList)
      members.zip(expect).foreach { case ((_, bytes), (id, _, _)) =>
        assert(new String(bytes, "UTF-8").startsWith(s"document number $id "))
      }
    }
    // the archives also open with a reference tar implementation: the
    // JDK has none, so verify the ustar checksum invariant directly
    val first = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(f"$dirA/shard-${0}%05d.tar")).take(512)
    val stored = Integer.parseInt(new String(first, 148, 6, "US-ASCII"), 8)
    val recomputed = first.zipWithIndex.map { case (b, i) =>
      if (i >= 148 && i < 156) ' '.toInt else b & 0xff
    }.sum
    assert(stored === recomputed, "ustar checksum mismatch")
  }

  test("a tar truncated inside member padding refuses instead of hanging") {
    val hconf = graft.zarr.SerializableHadoopConf.fromActiveSession()
    val payload = "short".getBytes("UTF-8")
    val full = Shards.tarHeader("000000001.1.txt", payload.length.toLong) ++ payload
    // cut BEFORE the 512-padding completes (and before end blocks)
    val tmp = java.nio.file.Files.createTempFile("trunc", ".tar")
    java.nio.file.Files.write(tmp, full ++ new Array[Byte](100))
    val e = intercept[IllegalArgumentException] {
      Shards.readTarShard(tmp.toString, hconf).toList
    }
    assert(e.getMessage.contains("truncated padding"))
  }
}
