package graft.core

/** A decoded column chunk: one typed value vector.
  *
  * The engine's value model mirrors the reference's physical types that our
  * input schema can produce (`/root/reference/src/basic.rs:39-48` BOOLEAN /
  * INT32 / INT64 / FLOAT / DOUBLE / BYTE_ARRAY): strings travel as UTF-8
  * byte arrays so encode/decode is byte-exact.
  */
sealed trait ColVec {
  def length: Int
  def physicalType: Int
  /** Raw (uncompressed, PLAIN-equivalent) byte size, the codec baseline. */
  def rawSize: Long
}

object PhysicalType {
  val Bool = 0
  val Int32 = 1
  val Int64 = 2
  val Float = 3
  val Double = 4
  val Bytes = 5 // BYTE_ARRAY (UTF8 strings included)
}

final case class BoolVec(values: Array[Boolean]) extends ColVec {
  def length: Int = values.length
  def physicalType: Int = PhysicalType.Bool
  def rawSize: Long = (values.length + 7L) / 8L
}
final case class IntVec(values: Array[Int]) extends ColVec {
  def length: Int = values.length
  def physicalType: Int = PhysicalType.Int32
  def rawSize: Long = 4L * values.length
}
final case class LongVec(values: Array[Long]) extends ColVec {
  def length: Int = values.length
  def physicalType: Int = PhysicalType.Int64
  def rawSize: Long = 8L * values.length
}
final case class FloatVec(values: Array[Float]) extends ColVec {
  def length: Int = values.length
  def physicalType: Int = PhysicalType.Float
  def rawSize: Long = 4L * values.length
}
final case class DoubleVec(values: Array[Double]) extends ColVec {
  def length: Int = values.length
  def physicalType: Int = PhysicalType.Double
  def rawSize: Long = 8L * values.length
}
/** BYTE_ARRAY; each value is an independent byte array (UTF-8 for strings). */
final case class BytesVec(values: Array[Array[Byte]]) extends ColVec {
  def length: Int = values.length
  def physicalType: Int = PhysicalType.Bytes
  def rawSize: Long = {
    var s = 0L
    var i = 0
    while (i < values.length) { s += 4L + values(i).length; i += 1 }
    s
  }
}

/** Codec ids persisted in chunk blobs and lineage rows. */
object CodecId {
  val Plain = 0
  val Dict = 1              // dict page PLAIN + RLE/bit-packed id stream
  val RleBool = 2           // boolean RLE value encoding (page v2)
  val DeltaBinaryPacked = 3 // INT32/INT64 frame-of-reference
  val DeltaLengthByteArray = 4
  val DeltaByteArray = 5    // front-coding (shared prefixes)
  val Fsst = 6              // extension: FSST-style string symbol table

  val names: Map[Int, String] = Map(
    Plain -> "PLAIN",
    Dict -> "DICT",
    RleBool -> "RLE",
    DeltaBinaryPacked -> "DELTA_BINARY_PACKED",
    DeltaLengthByteArray -> "DELTA_LENGTH_BYTE_ARRAY",
    DeltaByteArray -> "DELTA_BYTE_ARRAY",
    Fsst -> "FSST",
  )
}
