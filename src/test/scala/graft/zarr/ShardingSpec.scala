package graft.zarr

import graft.SparkSpec
import graft.meta.Model._
import graft.operators.{ChunkOps, MultiscaleBuilder, OmeZarrIO}
import java.nio.file.Files

class ShardingSpec extends SparkSpec {

  test("shard build/parse round-trips with crc32c and missing chunks") {
    val enc = Map(0 -> Array[Byte](1, 2, 3), 2 -> Array[Byte](9, 8))
    val shard = Sharding.buildShard(4, enc)
    val back = Sharding.parseShard(shard, 4)
    assert(back.keySet == Set(0, 2))
    assert(back(0).toSeq == Seq[Byte](1, 2, 3) && back(2).toSeq == Seq[Byte](9, 8))
    // footer-only present-chunk listing (sparse-shard tooling reads
    // just indexSize bytes from the object tail, never the payload)
    val footer = shard.takeRight(Sharding.indexSize(4))
    assert(Sharding.presentPositions(footer, 4) == Seq(0, 2))
    // corrupt the index → crc failure
    val corrupted = shard.clone()
    corrupted(shard.length - 10) = (corrupted(shard.length - 10) ^ 0xff).toByte
    assertThrows[IllegalArgumentException](Sharding.parseShard(corrupted, 4))
  }

  test("inner index math round-trips") {
    val cps = Seq(2, 4)
    for (a <- 0 until 2; b <- 0 until 4) {
      val flat = Sharding.innerFlatIndex(Seq(a, b), cps)
      assert(Sharding.innerPosition(flat, cps) == Seq(a, b))
    }
  }

  test("v0.5 sharded write/read: 4 chunks per shard, data parity (S6)") {
    val m = ImageMeta(Seq("y", "x"), Seq(128, 128), Seq(32, 32), "uint16",
      Map("y" -> 1.0, "x" -> 1.0), Map("y" -> 0.0, "x" -> 0.0))
    val r = new scala.util.Random(5)
    val vals = Array.fill(128 * 128)(r.nextInt(60000).toDouble)
    val base = MultiscaleBuilder.Level(m, ChunkOps.fromArray(spark, vals, m))
    val ms = MultiscaleBuilder.toMultiscales(spark, base,
      Some(Seq(Map("y" -> 2, "x" -> 2))), Method.ItkwasmBinShrink, cache = false)
    val dir = Files.createTempDirectory("shard").toString + "/img.zarr"
    OmeZarrIO.writeMultiscales(spark, dir, ms, version = "0.5",
      compressor = Some("zstd"), chunksPerShard = Some(Seq(2, 2)))
    // 128/32 = 4x4 chunk grid packed 2x2 per shard → 2x2 = 4 shard objects
    val shardFiles = new java.io.File(s"$dir/scale0/image/c").listFiles().flatMap(_.listFiles())
    assert(shardFiles.length == 4)
    // metadata advertises shard grid + inner chunks
    val doc = new String(Files.readAllBytes(java.nio.file.Paths.get(s"$dir/scale0/image/zarr.json")))
    assert(doc.contains("sharding_indexed"))
    val back = OmeZarrIO.readMultiscales(spark, dir)
    assert(back.levels.head.meta.chunks == Seq(32, 32)) // inner chunks exposed
    assert(ChunkOps.toArray(back.levels.head.chunks, back.levels.head.meta).toSeq == vals.toSeq)
    assert(ChunkOps.toArray(back.levels(1).chunks, back.levels(1).meta).toSeq ==
      ChunkOps.toArray(ms.levels(1).chunks, ms.levels(1).meta).toSeq)
  }

  test("sharding on v0.4 is rejected (V3)") {
    val m = ImageMeta(Seq("y", "x"), Seq(8, 8), Seq(4, 4), "uint8",
      Map("y" -> 1.0, "x" -> 1.0), Map("y" -> 0.0, "x" -> 0.0))
    val base = MultiscaleBuilder.Level(m, ChunkOps.fromArray(spark, new Array[Double](64), m))
    val ms = MultiscaleBuilder.Multiscale(Seq(base), Method.ItkwasmBinShrink)
    val dir = Files.createTempDirectory("shardbad").toString + "/img.zarr"
    assertThrows[IllegalArgumentException](
      OmeZarrIO.writeMultiscales(spark, dir, ms, version = "0.4",
        chunksPerShard = Some(Seq(2, 2))))
  }
}
