package graft.sources

import java.util
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, GreaterThan, GreaterThanOrEqual, In, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import graft.meta.{Dtypes, ZarrJson}
import graft.zarr.{Codecs, ZarrStore}
import graft.operators.ChunkOps

import scala.jdk.CollectionConverters._

/** DataSource V2 read path for OME-Zarr stores (SURVEY S1/M2):
  *
  * {{{ spark.read.format("omezarr").load("/path/img.zarr") }}}
  *
  * → the chunk table `(scale, chunk_idx, origin, shape, dtype, data)`,
  * one InputPartition per Zarr chunk.
  *
  * Scale-pruning: predicates on `scale` push into partition planning
  * (`SupportsPushDownFilters`), so `WHERE scale = 3` lists only that
  * level's chunks — the Spark form of the reference's lazy per-level
  * scan. Column pruning (`SupportsPushDownRequiredColumns`): when
  * `data` isn't selected, readers never fetch or decompress chunk
  * payloads — metadata-only queries cost metadata-only I/O.
  */
class OmeZarrTableProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "omezarr"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    OmeZarrTable.Schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new OmeZarrTable(properties.get("path"))
}

object OmeZarrTable {
  val Schema: StructType = StructType(Seq(
    StructField("scale", IntegerType, nullable = false),
    StructField("chunk_idx", ArrayType(IntegerType), nullable = false),
    StructField("origin", ArrayType(LongType), nullable = false),
    StructField("shape", ArrayType(IntegerType), nullable = false),
    StructField("dtype", StringType, nullable = false),
    StructField("data", BinaryType, nullable = false)))
}

class OmeZarrTable(path: String) extends Table with SupportsRead {
  require(path != null, "omezarr requires a path")
  override def name(): String = s"omezarr:$path"
  override def schema(): StructType = OmeZarrTable.Schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new OmeZarrScanBuilder(path)
}

final case class OmeZarrInputPartition(scale: Int, idx: Seq[Int], arrayPath: String,
    shape: Seq[Long], chunks: Seq[Int], dtype: String, bigEndian: Boolean,
    compressor: Option[String], separator: String, zarrFormat: Int,
    path: String) extends InputPartition

class OmeZarrScanBuilder(path: String)
    extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var pushedScale: Option[Int => Boolean] = None
  private var pushed: Array[Filter] = Array.empty
  private var requiredSchema: StructType = OmeZarrTable.Schema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (supported, rest) = filters.partition {
      case EqualTo("scale", _: Number) | GreaterThan("scale", _: Number) |
           LessThan("scale", _: Number) | GreaterThanOrEqual("scale", _: Number) |
           LessThanOrEqual("scale", _: Number) | In("scale", _) => true
      case _ => false
    }
    pushed = supported
    val preds: Seq[Int => Boolean] = supported.toSeq.map {
      case EqualTo("scale", v: Number) => (s: Int) => s == v.intValue()
      case GreaterThan("scale", v: Number) => (s: Int) => s > v.intValue()
      case LessThan("scale", v: Number) => (s: Int) => s < v.intValue()
      case GreaterThanOrEqual("scale", v: Number) => (s: Int) => s >= v.intValue()
      case LessThanOrEqual("scale", v: Number) => (s: Int) => s <= v.intValue()
      case In("scale", vs) =>
        val set = vs.collect { case n: Number => n.intValue() }.toSet
        (s: Int) => set.contains(s)
    }
    if (preds.nonEmpty) pushedScale = Some(s => preds.forall(_(s)))
    // scale predicates are fully handled by partition pruning, but we
    // leave them in the post-scan filter too (cheap, keeps planner honest)
    rest ++ supported
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(required: StructType): Unit = { requiredSchema = required }

  override def build(): Scan = new OmeZarrScan(path, pushedScale, requiredSchema)
}

class OmeZarrScan(path: String, scalePred: Option[Int => Boolean],
    required: StructType) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    val store = new ZarrStore(path)
    val zarrFormat = if (store.exists(".zattrs")) 2 else 3
    val rootJson =
      if (zarrFormat == 2) store.readString(".zattrs")
      else ZarrJson.mapper.writeValueAsString(
        ZarrJson.mapper.readTree(store.readString("zarr.json")).path("attributes"))
    val meta = ZarrJson.parseMultiscales(rootJson)
    meta.datasets.zipWithIndex
      .filter { case (_, i) => scalePred.forall(_(i)) }
      .flatMap { case (d, i) =>
        val (shape, chunks, dtypeRaw, comp, sep) =
          if (zarrFormat == 2) ZarrJson.parseZarrayV2(store.readString(s"${d.path}/.zarray"))
          else {
            val (s, c, dt, cp, _) = ZarrJson.parseZarrayV3(store.readString(s"${d.path}/zarr.json"))
            (s, c, dt, cp, "/")
          }
        ZarrStore.gridPositions(ZarrStore.chunkGrid(shape, chunks)).map { idx =>
          OmeZarrInputPartition(i, idx, d.path, shape, chunks,
            Dtypes.normalize(dtypeRaw), Dtypes.isBigEndian(dtypeRaw), comp, sep,
            zarrFormat, path)
        }
      }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new OmeZarrReaderFactory(required)
}

class OmeZarrReaderFactory(required: StructType) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[OmeZarrInputPartition]
    new PartitionReader[InternalRow] {
      private var done = false
      private val needData = required.fieldNames.contains("data")

      override def next(): Boolean = !done

      override def get(): InternalRow = {
        done = true
        val cShape = ZarrStore.chunkShapeAt(p.shape, p.chunks, p.idx)
        val origin = ZarrStore.chunkOriginAt(p.chunks, p.idx)
        val values: Map[String, Any] = Map(
          "scale" -> p.scale,
          "chunk_idx" -> ArrayData.toArrayData(p.idx.toArray),
          "origin" -> ArrayData.toArrayData(origin.toArray),
          "shape" -> ArrayData.toArrayData(cShape.toArray),
          "dtype" -> UTF8String.fromString(p.dtype)) ++
          (if (needData) Map("data" -> readPayload(cShape)) else Map.empty)
        new GenericInternalRow(required.fieldNames.map(values(_)).toArray[Any])
      }

      /** Fetch + decompress + clip the chunk payload — only invoked
        * when the `data` column survives pruning.
        */
      private def readPayload(cShape: Seq[Int]): Array[Byte] = {
        val st = new ZarrStore(p.path)
        val key = ZarrStore.chunkKey(p.zarrFormat, p.arrayPath, p.idx, p.separator)
        val fullSize = p.chunks.product * Dtypes.itemSize(p.dtype)
        val raw = Codecs.decompress(p.compressor, st.readBytes(key), fullSize)
        val full = ZarrStore.decodeToDoubles(raw, p.dtype, p.bigEndian)
        val clipped =
          if (cShape == p.chunks) full
          else ChunkOps.sliceBlock(full, p.chunks.toArray,
            Array.fill(p.chunks.length)(0), cShape.toArray)
        ZarrStore.encodeFromDoubles(clipped, p.dtype)
      }

      override def close(): Unit = ()
    }
  }
}
