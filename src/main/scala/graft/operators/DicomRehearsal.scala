package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** DICOM-ingest-at-scale rehearsal: a 256-slice 256×256 int16 series
  * (16.8M voxels) whose slices cycle through ALL SIX decodable
  * lossless transfer syntaxes — explicit LE, RLE, JPEG-LS, JPEG
  * Lossless (SV1), JPEG 2000 (signed reversible 5/3) and Deflated
  * Explicit VR LE — written by one distributed job (one task per
  * slice, pixel bytes never transit the driver), then read back
  * through [[DicomIO.readSeriesDir]]'s two-pass design and checked
  * EXACTLY against the closed-form voxel plant: Σv, Σv·(x + 3y + 7z)
  * and the voxel count must match the analytically computed values.
  *
  * This pins two things per round: the wall time of the pure-JVM
  * codec fleet (T.87/T.81/T.800/MQ decode throughput under Spark
  * task parallelism — the shape a 100k-slice archive ingest scales
  * from), and the exactness of every codec at volume (any drift in
  * any slice breaks the checksum, like the i68 gate but 64× the
  * data). Instance numbers are written SHUFFLED (bit-reversed) so
  * the z-order fix is load-bearing at scale too.
  *
  * Lives in main so [[graft.Bench]] reports wall time per round
  * (`i_dicom256`); opt out with SPARK_GRAFT_BENCH_DICOM=0.
  */
object DicomRehearsal {

  /** Planted voxel value: small closed form, signed to exercise the
    * two's-complement paths (range [-500, ~1500]).
    */
  def valueAt(x: Int, y: Int, z: Int): Int =
    (x * 3 + y * 5 + z * 7) % 2000 - 500

  /** Bit-reverse within 8 bits: a deterministic shuffle of instance
    * numbers so file order != z order.
    */
  private def rev8(i: Int): Int = {
    var v = i & 0xff
    v = ((v & 0x55) << 1) | ((v >> 1) & 0x55)
    v = ((v & 0x33) << 2) | ((v >> 2) & 0x33)
    ((v & 0x0f) << 4) | ((v >> 4) & 0x0f)
  }

  def run(spark: SparkSession, nSlices: Int = 256, side: Int = 256): Double = {
    import spark.implicits._
    val t0 = System.nanoTime()
    val dir = java.nio.file.Files.createTempDirectory("dicom_rehearsal")

    // one distributed write task per slice; the file name is the
    // shuffled position, the InstanceNumber the true z + 1
    val dirStr = dir.toString
    spark.range(nSlices.toLong)
      .repartition(math.min(nSlices, spark.sparkContext.defaultParallelism * 2))
      .map { zi =>
        val z = zi.toInt
        val px = Array.tabulate[Short](side * side) { p =>
          valueAt(p % side, p / side, z).toShort
        }
        val inst = z + 1
        val bytes = z % 6 match {
          case 0 => DicomIO.encodeSliceInt16(side, side, inst, z * 1.0,
            (1.0, 1.0), 1.0, px)
          case 1 => DicomIO.encodeSliceRleInt16(side, side, inst, z * 1.0,
            (1.0, 1.0), 1.0, px)
          case 2 => DicomIO.encodeSliceJpegLsInt16(side, side, inst, z * 1.0,
            (1.0, 1.0), 1.0, px)
          case 3 => DicomIO.encodeSliceJpegLosslessInt16(side, side, inst, z * 1.0,
            (1.0, 1.0), 1.0, px)
          case 4 => DicomIO.encodeSliceJpeg2kInt16(side, side, inst, z * 1.0,
            (1.0, 1.0), 1.0, px)
          case _ => DicomIO.encodeSliceDeflatedInt16(side, side, inst, z * 1.0,
            (1.0, 1.0), 1.0, px)
        }
        java.nio.file.Files.write(
          java.nio.file.Paths.get(s"$dirStr/s${rev8(z)}_$z.dcm"), bytes)
        1
      }.count()

    val img = DicomIO.readSeriesDir(spark, dirStr)
    require(img.meta.shape == Seq(side.toLong, side.toLong, nSlices.toLong),
      s"rehearsal shape ${img.meta.shape}")
    val got = ChunkOps.voxelView(spark, img.chunks, img.meta)
      .agg(sum(col("value")).cast("bigint").as("s"),
        sum(col("value") * (col("x") + col("y") * 3 + col("z") * 7))
          .cast("bigint").as("w"),
        count(lit(1)).as("n"))
      .collect()(0)

    // closed-form expectation, computed driver-side in one pass over
    // the formula (not the data)
    var es = 0L
    var ew = 0L
    var z = 0
    while (z < nSlices) {
      var y = 0
      while (y < side) {
        var x = 0
        while (x < side) {
          val v = valueAt(x, y, z).toLong
          es += v
          ew += v * (x + y * 3 + z * 7)
          x += 1
        }
        y += 1
      }
      z += 1
    }
    require(got.getLong(2) == side.toLong * side * nSlices,
      s"voxel count ${got.getLong(2)}")
    require(got.getLong(0) == es && got.getLong(1) == ew,
      s"checksum mismatch: (${got.getLong(0)}, ${got.getLong(1)}) vs ($es, $ew) " +
        "— some codec decoded drifted pixels")

    // cleanup: the fixture is rehearsal-local
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.list(dir).iterator().asScala.foreach(p =>
      java.nio.file.Files.delete(p))
    java.nio.file.Files.delete(dir)
    (System.nanoTime() - t0) / 1e9
  }
}
