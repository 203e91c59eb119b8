package graft.meta

import org.apache.spark.sql.types._

/** Element-dtype registry: the write path's explicit numpy↔zarr map
  * (ngff-zarr `py/ngff_zarr/to_ngff_zarr.py:89-117`) plus the JVM/
  * Spark mapping decisions of SURVEY §1.2:
  *  - unsigned ints decode into the next-wider signed Spark type
  *    (uint64 → LongType, documented lossy above 2^63);
  *  - float16 widens to FloatType in memory;
  *  - complex64/128 become struct(re, im);
  *  - foreign endianness is normalized to little-endian on read
  *    (`py/ngff_zarr/from_ngff_zarr.py:127-131`).
  */
object Dtypes {

  val All: Set[String] = Set(
    "bool", "int8", "int16", "int32", "int64",
    "uint8", "uint16", "uint32", "uint64",
    "float16", "float32", "float64", "complex64", "complex128")

  /** Strip numpy byte-order prefix: "<u2"/">u2"/"|u1"-style or
    * "<uint16" spellings normalize to the bare name.
    */
  def normalize(dtype: String): String = {
    val stripped = if (dtype.nonEmpty && "<>|=".contains(dtype.head)) dtype.tail else dtype
    val named = stripped match {
      case "b1" => "bool"
      case "i1" => "int8"   case "i2" => "int16"
      case "i4" => "int32"  case "i8" => "int64"
      case "u1" => "uint8"  case "u2" => "uint16"
      case "u4" => "uint32" case "u8" => "uint64"
      case "f2" => "float16" case "f4" => "float32" case "f8" => "float64"
      case "c8" => "complex64" case "c16" => "complex128"
      case other => other
    }
    require(All.contains(named), s"dtype $dtype cannot be mapped to a Zarr core dtype")
    named
  }

  def isBigEndian(dtype: String): Boolean = dtype.startsWith(">")

  def itemSize(dtype: String): Int = normalize(dtype) match {
    case "bool" | "int8" | "uint8" => 1
    case "int16" | "uint16" | "float16" => 2
    case "int32" | "uint32" | "float32" => 4
    case "int64" | "uint64" | "float64" | "complex64" => 8
    case "complex128" => 16
  }

  /** Spark in-memory type; unsigned widens, float16 widens. */
  def sparkType(dtype: String): DataType = normalize(dtype) match {
    case "bool" => BooleanType
    case "int8" => ByteType
    case "int16" => ShortType
    case "int32" => IntegerType
    case "int64" => LongType
    case "uint8" => ShortType
    case "uint16" => IntegerType
    case "uint32" => LongType
    case "uint64" => LongType // documented: values ≥ 2^63 wrap
    case "float16" | "float32" => FloatType
    case "float64" => DoubleType
    case "complex64" | "complex128" =>
      StructType(Seq(StructField("re", DoubleType), StructField("im", DoubleType)))
  }

  /** Zarr v2 dtype string (numpy typestr, little-endian). */
  def zarrV2TypeStr(dtype: String): String = normalize(dtype) match {
    case "bool" => "|b1"
    case "int8" => "|i1"   case "int16" => "<i2"
    case "int32" => "<i4"  case "int64" => "<i8"
    case "uint8" => "|u1"  case "uint16" => "<u2"
    case "uint32" => "<u4" case "uint64" => "<u8"
    case "float16" => "<f2" case "float32" => "<f4" case "float64" => "<f8"
    case "complex64" => "<c8" case "complex128" => "<c16"
  }
}
