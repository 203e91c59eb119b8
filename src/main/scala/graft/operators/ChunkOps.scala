package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.meta.Model.ImageMeta
import graft.meta.Dtypes
import graft.zarr.ZarrStore

/** The chunk table: one row per Zarr chunk (SURVEY §7.1), the
  * engine's primary physical representation of an image level.
  * Payloads are raw dtype-encoded little-endian C-order bytes;
  * compression exists only at the store boundary.
  *
  * All heavy operators are chunk-granular Dataset transforms:
  *  - per-chunk kernels → `mapPartitions` (no shuffle);
  *  - stencil kernels → halo exchange: `flatMap` pieces to target
  *    chunks → `groupByKey(target)` → assemble + kernel (one shuffle
  *    keyed by chunk index — the Spark form of dask's map_overlap);
  *  - `rechunk` (P4) uses the same piece/assemble machinery.
  */
object ChunkOps {

  final case class ChunkRow(chunkIdx: Seq[Int], origin: Seq[Long],
      shape: Seq[Int], data: Array[Byte])

  /** A slice of a source chunk destined for (the possibly
    * halo-extended block of) a target chunk. `data` is dtype-encoded
    * (NOT doubles): pieces transit shuffles, and uint8/uint16 imaging
    * payloads would inflate 8×/4× as double arrays.
    */
  final case class Piece(targetKey: String, targetIdx: Seq[Int],
      destPos: Seq[Int], shape: Seq[Int], data: Array[Byte])

  final case class VoxelRow(t: Long, c: Long, z: Long, y: Long, x: Long, value: Double)

  // ---- construction / materialization (driver-side, tests & ingest) ----

  /** Decompose a C-order array into its chunk rows — pure, so it runs
    * on the driver (tests) or inside an executor task (streaming
    * ingest of whole-field payloads without driver materialization).
    */
  def decompose(values: Array[Double], meta: ImageMeta): Seq[ChunkRow] = {
    val grid = ZarrStore.chunkGrid(meta.shape, meta.chunks)
    val shapeArr = meta.shape.toArray
    val strides = NdKernels.strides(shapeArr.map(_.toInt))
    ZarrStore.gridPositions(grid).map { idx =>
      val cShape = ZarrStore.chunkShapeAt(meta.shape, meta.chunks, idx)
      val cOrigin = ZarrStore.chunkOriginAt(meta.chunks, idx)
      val block = new Array[Double](cShape.product)
      var flat = 0
      val pos = new Array[Int](cShape.length)
      while (flat < block.length) {
        var src = 0
        var d = 0
        while (d < pos.length) { src += (cOrigin(d).toInt + pos(d)) * strides(d); d += 1 }
        block(flat) = values(src)
        var dd = pos.length - 1
        var carry = true
        while (carry && dd >= 0) {
          pos(dd) += 1
          if (pos(dd) == cShape(dd)) { pos(dd) = 0; dd -= 1 } else carry = false
        }
        flat += 1
      }
      ChunkRow(idx, cOrigin, cShape, ZarrStore.encodeFromDoubles(block, meta.dtype))
    }.toSeq
  }

  /** Build a chunk table from an in-memory C-order array. */
  def fromArray(spark: SparkSession, values: Array[Double], meta: ImageMeta): Dataset[ChunkRow] = {
    import spark.implicits._
    val rows = decompose(values, meta)
    // a few chunks per partition: tiny test images shouldn't pay for
    // 32-task stages
    spark.createDataset(rows).repartition(math.max(1, math.min((rows.size + 3) / 4, 32)))
  }

  /** Collect a chunk table back to one C-order array (tests only). */
  def toArray(ds: Dataset[ChunkRow], meta: ImageMeta): Array[Double] = {
    val out = new Array[Double](meta.shape.product.toInt)
    val strides = NdKernels.strides(meta.shape.map(_.toInt).toArray)
    ds.collect().foreach { c =>
      val vals = ZarrStore.decodeToDoubles(c.data, meta.dtype)
      val cShape = c.shape.toArray
      var flat = 0
      val pos = new Array[Int](cShape.length)
      while (flat < vals.length) {
        var dst = 0
        var d = 0
        while (d < pos.length) { dst += (c.origin(d).toInt + pos(d)) * strides(d); d += 1 }
        out(dst) = vals(flat)
        var dd = pos.length - 1
        var carry = true
        while (carry && dd >= 0) {
          pos(dd) += 1
          if (pos(dd) == cShape(dd)) { pos(dd) = 0; dd -= 1 } else carry = false
        }
        flat += 1
      }
    }
    out
  }

  // ---- voxel view (P2/P6/P7 surface + oracle checks) ----

  /** Explode chunks to the relational voxel view (t,c,z,y,x,value).
    * Generated on demand — never materialized at full scale; Catalyst
    * prunes it like any other DataFrame.
    */
  def voxelView(spark: SparkSession, ds: Dataset[ChunkRow], meta: ImageMeta): DataFrame = {
    import spark.implicits._
    val dims = meta.dims
    val dtype = meta.dtype
    ds.flatMap { chunk =>
      val vals = ZarrStore.decodeToDoubles(chunk.data, dtype)
      val cShape = chunk.shape.toArray
      val nd = cShape.length
      val pos = new Array[Int](nd)
      val coords = scala.collection.mutable.Map("t" -> 0L, "c" -> 0L, "z" -> 0L, "y" -> 0L, "x" -> 0L)
      val it = Iterator.tabulate(vals.length) { flat =>
        var d = 0
        while (d < nd) { coords(dims(d)) = chunk.origin(d) + pos(d); d += 1 }
        val row = VoxelRow(coords("t"), coords("c"), coords("z"), coords("y"), coords("x"), vals(flat))
        var dd = nd - 1
        var carry = true
        while (carry && dd >= 0) {
          pos(dd) += 1
          if (pos(dd) == cShape(dd)) { pos(dd) = 0; dd -= 1 } else carry = false
        }
        row
      }
      it
    }.toDF()
  }

  final case class ComplexVoxelRow(t: Long, c: Long, z: Long, y: Long, x: Long,
      re: Double, im: Double)

  /** Voxel view for complex64/128 payloads: one row per voxel with
    * struct-style (re, im) columns (SURVEY §1.2 complex mapping).
    */
  def complexVoxelView(spark: SparkSession, ds: Dataset[ChunkRow], meta: ImageMeta): DataFrame = {
    import spark.implicits._
    val dims = meta.dims
    val dtype = meta.dtype
    ds.flatMap { chunk =>
      val vals = ZarrStore.decodeComplex(chunk.data, dtype)
      val cShape = chunk.shape.toArray
      val nd = cShape.length
      val pos = new Array[Int](nd)
      val coords = scala.collection.mutable.Map("t" -> 0L, "c" -> 0L, "z" -> 0L, "y" -> 0L, "x" -> 0L)
      Iterator.tabulate(vals.length / 2) { flat =>
        var d = 0
        while (d < nd) { coords(dims(d)) = chunk.origin(d) + pos(d); d += 1 }
        val row = ComplexVoxelRow(coords("t"), coords("c"), coords("z"), coords("y"), coords("x"),
          vals(2 * flat), vals(2 * flat + 1))
        var dd = nd - 1
        var carry = true
        while (carry && dd >= 0) {
          pos(dd) += 1
          if (pos(dd) == cShape(dd)) { pos(dd) = 0; dd -= 1 } else carry = false
        }
        row
      }
    }.toDF()
  }

  /** Inverse of [[voxelView]]: materialize a relational voxel frame
    * `(t,c,z,y,x,value)` back into a chunk table — the path that lets
    * a pure SQL/DataFrame computation over voxels become an image
    * again (and then an OME-Zarr store). One shuffle keyed by the
    * owning chunk; absent dims are ignored.
    */
  def fromVoxelView(spark: SparkSession, voxels: org.apache.spark.sql.DataFrame,
      meta: ImageMeta): Dataset[ChunkRow] = {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val dims = meta.dims
    val chunks = meta.chunks
    val shape = meta.shape
    val dtype = meta.dtype
    val nd = dims.length
    val typed = voxels
      .select((dims.map(d => col(d).cast("long")) :+ col("value").cast("double")): _*)
      .rdd.map { row =>
        val coords = Array.tabulate(nd)(d => row.getLong(d))
        val v = row.getDouble(nd)
        val idx = Array.tabulate(nd)(d => (coords(d) / chunks(d)).toInt)
        (idx.toSeq, (coords.toSeq, v))
      }
    // partitions ∝ assembled volume (≈128 MB each), floored at the
    // cluster parallelism and capped at one per chunk — a fixed cap
    // would serialize a large assembly onto a handful of tasks
    val gridSize = ZarrStore.chunkGrid(shape, chunks).map(_.toLong).product
    val chunkBytes = chunks.map(_.toLong).product * Dtypes.itemSize(dtype)
    val targetParts = math.max(spark.sparkContext.defaultParallelism.toLong,
      gridSize * chunkBytes / (128L << 20) + 1)
    val assembled = typed.groupByKey(
      math.max(1L, math.min(gridSize, targetParts)).toInt)
      .map { case (idx, vs) =>
        val cShape = ZarrStore.chunkShapeAt(shape, chunks, idx)
        val cOrigin = ZarrStore.chunkOriginAt(chunks, idx)
        val str = NdKernels.strides(cShape.toArray)
        val block = new Array[Double](cShape.product)
        vs.foreach { case (coords, v) =>
          var flat = 0
          var d = 0
          while (d < coords.length) { flat += (coords(d) - cOrigin(d)).toInt * str(d); d += 1 }
          block(flat) = v
        }
        ChunkRow(idx, cOrigin, cShape, ZarrStore.encodeFromDoubles(block, dtype))
      }
    spark.createDataset(assembled)
  }

  // ---- rechunk (P4) ----

  /** Re-block the chunk table to a new chunk grid: split every chunk
    * into pieces addressed to target chunks, shuffle on the target
    * key, assemble. Metadata-only when the grid is unchanged.
    */
  def rechunk(spark: SparkSession, ds: Dataset[ChunkRow], meta: ImageMeta,
      newChunks: Seq[Int], force: Boolean = false): (ImageMeta, Dataset[ChunkRow]) = {
    import spark.implicits._
    // `force` re-blocks even when sizes match — used to restore the
    // regular grid after ops that rebase origins (slice)
    if (newChunks == meta.chunks && !force) return (meta, ds)
    val outMeta = meta.copy(chunks = newChunks)
    val shape = meta.shape
    val dtype = meta.dtype
    val nd = shape.length
    val pieces = ds.flatMap { chunk =>
      val vals = ZarrStore.decodeToDoubles(chunk.data, dtype)
      // target chunk index range intersecting this chunk, per dim
      val lo = Array.tabulate(nd)(d => (chunk.origin(d) / newChunks(d)).toInt)
      val hi = Array.tabulate(nd)(d =>
        ((chunk.origin(d) + chunk.shape(d) - 1) / newChunks(d)).toInt)
      ZarrStore.gridPositions(Array.tabulate(nd)(d => hi(d) - lo(d) + 1)).map { rel =>
        val tIdx = Array.tabulate(nd)(d => lo(d) + rel(d))
        // overlap region in global coords
        val gLo = Array.tabulate(nd)(d => math.max(chunk.origin(d), tIdx(d).toLong * newChunks(d)))
        val gHi = Array.tabulate(nd)(d => math.min(chunk.origin(d) + chunk.shape(d),
          math.min(shape(d), (tIdx(d) + 1).toLong * newChunks(d))))
        val pShape = Array.tabulate(nd)(d => (gHi(d) - gLo(d)).toInt)
        val srcOff = Array.tabulate(nd)(d => (gLo(d) - chunk.origin(d)).toInt)
        val destPos = Array.tabulate(nd)(d => (gLo(d) - tIdx(d).toLong * newChunks(d)).toInt)
        val sub = sliceBlock(vals, chunk.shape.toArray, srcOff, pShape)
        Piece(tIdx.mkString(","), tIdx.toSeq, destPos.toSeq, pShape.toSeq,
          ZarrStore.encodeFromDoubles(sub, dtype))
      }
    }
    val assembled = pieces.groupByKey(_.targetKey).mapGroups { (_, it) =>
      val ps = it.toSeq
      val tIdx = ps.head.targetIdx
      val tShape = ZarrStore.chunkShapeAt(shape, newChunks, tIdx)
      val tOrigin = ZarrStore.chunkOriginAt(newChunks, tIdx)
      val block = new Array[Double](tShape.product)
      ps.foreach(p => placeBlock(block, tShape.toArray, p.destPos.toArray, p.shape.toArray,
        ZarrStore.decodeToDoubles(p.data, dtype)))
      ChunkRow(tIdx, tOrigin, tShape, ZarrStore.encodeFromDoubles(block, dtype))
    }
    (outMeta, assembled)
  }

  /** Re-block directly into a key-partitioned RDD — the stencil path's
    * entry: one volume shuffle does both the re-block and the pinning
    * of chunks onto their key's partition, so the subsequent halo
    * exchange only moves halo bytes ([[Downsample]]). `mapValues`
    * after `groupByKey(part)` keeps the partitioner; when the grid is
    * already right the pin is a single `partitionBy`.
    */
  def rechunkPinned(spark: SparkSession, ds: Dataset[ChunkRow], meta: ImageMeta,
      newChunks: Seq[Int], part: org.apache.spark.Partitioner)
      : (ImageMeta, org.apache.spark.rdd.RDD[(String, ChunkRow)]) = {
    val outMeta = meta.copy(chunks = newChunks)
    if (newChunks == meta.chunks)
      return (outMeta, ds.rdd.map(c => (c.chunkIdx.mkString(","), c)).partitionBy(part))
    val shape = meta.shape
    val dtype = meta.dtype
    val nd = shape.length
    val pieces = ds.rdd.flatMap { chunk =>
      val vals = ZarrStore.decodeToDoubles(chunk.data, dtype)
      val lo = Array.tabulate(nd)(d => (chunk.origin(d) / newChunks(d)).toInt)
      val hi = Array.tabulate(nd)(d =>
        ((chunk.origin(d) + chunk.shape(d) - 1) / newChunks(d)).toInt)
      ZarrStore.gridPositions(Array.tabulate(nd)(d => hi(d) - lo(d) + 1)).map { rel =>
        val tIdx = Array.tabulate(nd)(d => lo(d) + rel(d))
        val gLo = Array.tabulate(nd)(d => math.max(chunk.origin(d), tIdx(d).toLong * newChunks(d)))
        val gHi = Array.tabulate(nd)(d => math.min(chunk.origin(d) + chunk.shape(d),
          math.min(shape(d), (tIdx(d) + 1).toLong * newChunks(d))))
        val pShape = Array.tabulate(nd)(d => (gHi(d) - gLo(d)).toInt)
        val srcOff = Array.tabulate(nd)(d => (gLo(d) - chunk.origin(d)).toInt)
        val destPos = Array.tabulate(nd)(d => (gLo(d) - tIdx(d).toLong * newChunks(d)).toInt)
        val sub = sliceBlock(vals, chunk.shape.toArray, srcOff, pShape)
        val key = tIdx.mkString(",")
        key -> Piece(key, tIdx.toSeq, destPos.toSeq, pShape.toSeq,
          ZarrStore.encodeFromDoubles(sub, dtype))
      }
    }
    val assembled = pieces.groupByKey(part).mapValues { ps0 =>
      val ps = ps0.toSeq
      val tIdx = ps.head.targetIdx
      val tShape = ZarrStore.chunkShapeAt(shape, newChunks, tIdx)
      val tOrigin = ZarrStore.chunkOriginAt(newChunks, tIdx)
      val block = new Array[Double](tShape.product)
      ps.foreach(p => placeBlock(block, tShape.toArray, p.destPos.toArray, p.shape.toArray,
        ZarrStore.decodeToDoubles(p.data, dtype)))
      ChunkRow(tIdx, tOrigin, tShape, ZarrStore.encodeFromDoubles(block, dtype))
    }
    (outMeta, assembled)
  }

  /** Copy a sub-block out of a C-order array. */
  def sliceBlock(in: Array[Double], shape: Array[Int], off: Array[Int],
      outShape: Array[Int]): Array[Double] = {
    val str = NdKernels.strides(shape)
    val out = new Array[Double](outShape.product)
    val pos = new Array[Int](shape.length)
    var flat = 0
    while (flat < out.length) {
      var src = 0
      var d = 0
      while (d < pos.length) { src += (off(d) + pos(d)) * str(d); d += 1 }
      out(flat) = in(src)
      var dd = pos.length - 1
      var carry = true
      while (carry && dd >= 0) {
        pos(dd) += 1
        if (pos(dd) == outShape(dd)) { pos(dd) = 0; dd -= 1 } else carry = false
      }
      flat += 1
    }
    out
  }

  /** Place a sub-block into a C-order array at `pos0`. */
  def placeBlock(dst: Array[Double], dstShape: Array[Int], pos0: Array[Int],
      blockShape: Array[Int], values: Array[Double]): Unit = {
    val str = NdKernels.strides(dstShape)
    val pos = new Array[Int](dstShape.length)
    var flat = 0
    while (flat < values.length) {
      var di = 0
      var d = 0
      while (d < pos.length) { di += (pos0(d) + pos(d)) * str(d); d += 1 }
      dst(di) = values(flat)
      var dd = pos.length - 1
      var carry = true
      while (carry && dd >= 0) {
        pos(dd) += 1
        if (pos(dd) == blockShape(dd)) { pos(dd) = 0; dd -= 1 } else carry = false
      }
      flat += 1
    }
  }
}
