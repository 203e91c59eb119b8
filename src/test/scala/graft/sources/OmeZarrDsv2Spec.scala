package graft.sources

import graft.SparkSpec
import graft.meta.Model._
import graft.operators.{ChunkOps, MultiscaleBuilder, OmeZarrIO}
import org.apache.spark.sql.functions._
import java.nio.file.Files

class OmeZarrDsv2Spec extends SparkSpec {

  private lazy val storePath: String = {
    val m = ImageMeta(Seq("y", "x"), Seq(64, 64), Seq(32, 32), "uint16",
      Map("y" -> 1.0, "x" -> 1.0), Map("y" -> 0.0, "x" -> 0.0))
    val vals = Array.tabulate(64 * 64)(i => (i % 1000).toDouble)
    val base = MultiscaleBuilder.Level(m, ChunkOps.fromArray(spark, vals, m))
    val ms = MultiscaleBuilder.toMultiscales(spark, base,
      Some(Seq(Map("y" -> 2, "x" -> 2))), Method.ItkwasmBinShrink, cache = false)
    val dir = Files.createTempDirectory("dsv2").toString + "/img.zarr"
    OmeZarrIO.writeMultiscales(spark, dir, ms, version = "0.4")
    dir
  }

  test("spark.read.format(omezarr) scans the chunk table") {
    val df = spark.read.format("omezarr").load(storePath)
    assert(df.schema.fieldNames.toSeq ==
      Seq("scale", "chunk_idx", "origin", "shape", "dtype", "data"))
    assert(df.count() == 5) // 4 chunks scale0 + 1 chunk scale1
    val r = df.filter(col("scale") === 1).head
    assert(r.getAs[scala.collection.Seq[Int]]("shape").toSeq == Seq(32, 32))
    assert(r.getAs[String]("dtype") == "uint16")
    assert(r.getAs[Array[Byte]]("data").length == 32 * 32 * 2)
  }

  test("scale predicate prunes partitions (pushdown)") {
    val df = spark.read.format("omezarr").load(storePath).filter(col("scale") === 0)
    assert(df.count() == 4)
    // the physical scan itself must plan only scale-0 partitions
    val scan = df.queryExecution.executedPlan.collectFirst {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }.get
    assert(scan.inputRDD.getNumPartitions == 4,
      s"expected 4 pruned partitions, got ${scan.inputRDD.getNumPartitions}")
  }

  test("column pruning skips payload fetch") {
    val df = spark.read.format("omezarr").load(storePath)
      .groupBy(col("scale")).agg(count(lit(1)).as("n_chunks"))
    val schema = df.queryExecution.optimizedPlan.collectFirst {
      case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation =>
        r.scan.readSchema()
    }.get
    assert(!schema.fieldNames.contains("data"), s"payload not pruned: $schema")
    assert(df.collect().map(r => r.getInt(0) -> r.getLong(1)).toMap == Map(0 -> 4L, 1 -> 1L))
  }

  test("DSv2 reads sharded v0.5 stores: inner chunks, exact payloads") {
    val m = ImageMeta(Seq("y", "x"), Seq(128, 128), Seq(32, 32), "uint16",
      Map("y" -> 1.0, "x" -> 1.0), Map("y" -> 0.0, "x" -> 0.0))
    val vals = Array.tabulate(128 * 128)(i => (i % 5000).toDouble)
    val ms = MultiscaleBuilder.Multiscale(Seq(
      MultiscaleBuilder.Level(m, ChunkOps.fromArray(spark, vals, m))), Method.ItkwasmBinShrink)
    val dir = Files.createTempDirectory("dsv2shard").toString + "/img.zarr"
    OmeZarrIO.writeMultiscales(spark, dir, ms, version = "0.5",
      chunksPerShard = Some(Seq(2, 2)))
    val df = spark.read.format("omezarr").load(dir)
    // 4x4 inner chunk grid exposed, not the 2x2 shard grid
    assert(df.count() == 16)
    val r = df.orderBy(col("chunk_idx")).head
    assert(r.getAs[scala.collection.Seq[Int]]("shape").toSeq == Seq(32, 32))
    val sumDsv2 = df.collect().map(row => graft.zarr.ZarrStore
      .decodeToDoubles(row.getAs[Array[Byte]]("data"), row.getAs[String]("dtype")).sum).sum
    assert(sumDsv2 == vals.sum)
    // metadata-only scans skip the shard fetch but still enumerate rows
    assert(df.groupBy().count().head.getLong(0) == 16)
  }

  test("scan statistics: payload pruning shrinks sizeInBytes; metadata join broadcasts") {
    // metadata-only projection reports orders less than the payload scan
    def stats(required: Seq[String]): Long = {
      val b = new OmeZarrScanBuilder(storePath)
      b.pruneColumns(org.apache.spark.sql.types.StructType(
        OmeZarrTable.Schema.filter(f => required.contains(f.name))))
      b.build().asInstanceOf[OmeZarrScan].estimateStatistics().sizeInBytes().getAsLong
    }
    val metaOnly = stats(Seq("scale", "chunk_idx"))
    val withPayload = stats(Seq("scale", "chunk_idx", "data"))
    assert(metaOnly < withPayload / 10,
      s"metadata-only $metaOnly should be far under payload $withPayload")

    // Catalyst uses the estimate: a join against the (small) omezarr
    // scan picks a broadcast strategy instead of shuffling both sides
    val dim = spark.read.format("omezarr").load(storePath)
      .select(col("scale"), col("chunk_idx"))
    val fact = spark.range(10000).select(
      (col("id") % 2).cast("int").as("scale"), col("id"))
    val plan = fact.join(dim, Seq("scale")).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join:\n$plan")
  }

  test("df.write.format(omezarr) round-trips a two-level pyramid") {
    val m0 = ImageMeta(Seq("y", "x"), Seq(64, 96), Seq(32, 32), "uint16",
      Map("y" -> 1.0, "x" -> 1.0), Map("y" -> 0.0, "x" -> 0.0))
    val vals = Array.tabulate(64 * 96)(i => (i % 7919).toDouble)
    val ds0 = ChunkOps.fromArray(spark, vals, m0)
    val (m1, ds1) = graft.operators.Downsample.step(spark, ds0, m0,
      Map("y" -> 2, "x" -> 2), Method.ItkwasmBinShrink)
    import spark.implicits._
    val chunkDf = ds0.map(c => (0, c.chunkIdx, c.origin, c.shape, "uint16", c.data))
      .union(ds1.map(c => (1, c.chunkIdx, c.origin, c.shape, "uint16", c.data)))
      .toDF("scale", "chunk_idx", "origin", "shape", "dtype", "data")
    val dir = Files.createTempDirectory("dsv2w").toString + "/img.zarr"
    chunkDf.write.format("omezarr")
      .option("levels", OmeZarrWriteMeta.levelsJson(Seq(m0, m1)))
      .option("dims", "y,x").option("dtype", "uint16")
      .option("compressor", "gzip")
      .mode("overwrite").save(dir)
    // re-read through the function reader and compare both levels
    val back = graft.operators.OmeZarrIO.readMultiscales(spark, dir, validate = true)
    assert(back.levels.map(_.meta.shape) == Seq(Seq(64L, 96L), Seq(32L, 48L)))
    assert(back.levels(1).meta.scale == Map("y" -> 2.0, "x" -> 2.0))
    assert(ChunkOps.toArray(back.levels.head.chunks, back.levels.head.meta).toSeq == vals.toSeq)
    assert(ChunkOps.toArray(back.levels(1).chunks, back.levels(1).meta).toSeq ==
      ChunkOps.toArray(ds1, m1).toSeq)
  }

  test("voxel values through DSv2 match the direct reader") {
    val viaDsv2 = spark.read.format("omezarr").load(storePath)
      .filter(col("scale") === 0)
      .select(sum(length(col("data"))))
      .head.getLong(0) // total payload bytes
    assert(viaDsv2 == 4 * 32 * 32 * 2)
    val direct = OmeZarrIO.readMultiscales(spark, storePath)
    val sumDirect = ChunkOps.toArray(direct.levels.head.chunks, direct.levels.head.meta).sum
    // decode DSv2 payloads via the same element codec and compare checksums
    val rows = spark.read.format("omezarr").load(storePath).filter(col("scale") === 0).collect()
    val sumDsv2 = rows.map(r => graft.zarr.ZarrStore
      .decodeToDoubles(r.getAs[Array[Byte]]("data"), r.getAs[String]("dtype")).sum).sum
    assert(sumDsv2 == sumDirect)
  }
}
