package graft.sources

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** proto3 wire-format encode/decode as native Catalyst expressions — the
  * engine's protobuf format (the reference's flink-formats/flink-protobuf:
  * `PbFormatFactory.java:40` registers the format; `deserialize/
  * ProtoToRowConverter.java` decodes messages to rows, `serialize/
  * RowToProtoConverter` the reverse). The reference generates Java
  * against protobuf-java descriptors; no protobuf jar resolves in this
  * environment, so the proto3 *wire format* itself (a public, stable
  * spec: varint / zigzag / length-delimited framing) is implemented
  * directly and driven by the Spark schema, field numbers taken from
  * declaration order (1-based) — the same positional mapping the
  * reference derives from the compiled descriptor.
  *
  * Supported (the flat-message surface of the reference's converter):
  *   - int32/int64 (IntegerType/LongType, varint, two's-complement 10-byte
  *     negatives — standard `intN` semantics, not `sintN`),
  *   - bool (BooleanType, varint 0/1),
  *   - double (wire type 1, fixed64 LE), float (wire type 5, fixed32 LE),
  *   - string (UTF-8) and bytes (wire type 2),
  *   - packed repeated numerics (ArrayType of int/long/double/float —
  *     proto3's default packed encoding),
  *   - unpacked repeated strings/bytes (one length-delimited field each),
  *   - nested messages (StructType, length-delimited),
  *   - proto3 maps (MapType → repeated `{ key = 1; value = 2 }` entry
  *     messages; duplicate keys merge last-wins, the spec's rule).
  *
  * proto3 semantics preserved: zero/empty/false scalars are OMITTED on
  * encode and default-filled on decode; unknown field numbers are skipped
  * by wire type (forward compatibility); repeated numeric fields accept
  * both packed and unpacked encodings on decode, as the spec requires;
  * duplicate occurrences of a singular message field MERGE (the spec's
  * rule: concatenating encodings merges the messages — occurrences are
  * buffered and decoded as one span); a tag whose wire type contradicts
  * the schema-declared type fails loudly (same IllegalArgumentException
  * as truncation), never silently misparses the rest of the message.
  *
  * Integer wire-encoding hints (the reference's flink-protobuf type
  * mapping carries sintN and (s)fixedN to the same Flink INT/BIGINT):
  * a field-level metadata entry `pb.encoding` selects the wire form for
  * IntegerType/LongType columns — absent/"varint" = intN (default),
  * "zigzag" = sintN, "fixed" = (s)fixedN — on scalars and packed/
  * unpacked repeated elements alike. Map entries stay intN (the
  * converter's surface).
  *
  * Scale shape: both directions are pure per-row projections (no shuffle,
  * no state); `CodegenFallback` keeps them inside the projection operator
  * like `from_json`.
  */
object ProtobufWire {

  /** Encode a struct column to proto3 wire bytes. */
  def toProtobuf(col: Column): Column =
    Bridge.column(PbEncode(Bridge.expression(col)))

  /** Decode proto3 wire bytes to a struct of `schema`. */
  def fromProtobuf(col: Column, schema: StructType): Column =
    Bridge.column(PbDecode(Bridge.expression(col), schema))

  /** SQL registration — `to_protobuf(struct(...))` and
    * `from_protobuf(bytes, 'k BIGINT, status STRING')` (the schema as a
    * foldable DDL-string literal, the same contract as Spark's own
    * `from_json`/`from_csv` SQL forms).
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("to_protobuf"),
      new ExpressionInfo(classOf[PbEncode].getName, "to_protobuf"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "to_protobuf expects 1 argument")
        PbEncode(children.head)
      })
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("from_protobuf"),
      new ExpressionInfo(classOf[PbDecode].getName, "from_protobuf"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          "from_protobuf expects (binary, 'ddl schema string')")
        val schema = children(1) match {
          case Literal(s: org.apache.spark.unsafe.types.UTF8String, StringType) =>
            org.apache.spark.sql.catalyst.parser.CatalystSqlParser
              .parseTableSchema(s.toString)
          case other => throw new IllegalArgumentException(
            "from_protobuf schema must be a string literal, got " + other)
        }
        PbDecode(children.head, schema)
      })
  }

  // ------------------------------------------------------------ encoding

  private def writeVarint(out: ByteArrayOutputStream, v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7fL) != 0) {
      out.write(((v & 0x7f) | 0x80).toInt)
      v >>>= 7
    }
    out.write(v.toInt & 0x7f)
  }

  private def writeTag(out: ByteArrayOutputStream, field: Int, wire: Int): Unit =
    writeVarint(out, (field.toLong << 3) | wire)

  private def writeFixed64(out: ByteArrayOutputStream, v: Long): Unit = {
    var i = 0
    while (i < 8) { out.write(((v >>> (8 * i)) & 0xff).toInt); i += 1 }
  }

  private def writeFixed32(out: ByteArrayOutputStream, v: Int): Unit = {
    var i = 0
    while (i < 4) { out.write((v >>> (8 * i)) & 0xff); i += 1 }
  }

  private def writeLenDelim(out: ByteArrayOutputStream, field: Int,
      bytes: Array[Byte]): Unit = {
    writeTag(out, field, 2)
    writeVarint(out, bytes.length.toLong)
    out.write(bytes, 0, bytes.length)
  }

  /** Field-metadata key selecting the integer wire form: "varint" (intN,
    * the default), "zigzag" (sintN), "fixed" ((s)fixedN).
    */
  val EncodingKey = "pb.encoding"

  private val ValidHints = Set("varint", "zigzag", "fixed")

  private def encodingHint(f: StructField): String =
    if (f.metadata.contains(EncodingKey)) {
      val h = f.metadata.getString(EncodingKey)
      // fail loud on a typo'd hint ("sint", "sfixed", …) — silently
      // falling through to varint would write/read the wrong wire form
      require(ValidHints.contains(h),
        s"invalid $EncodingKey '$h' on field '${f.name}': " +
          s"expected one of ${ValidHints.mkString(", ")}")
      h
    } else "varint"

  // zigzag (sintN): small negatives stay small on the wire
  private def zig32(v: Int): Long =
    ((v << 1) ^ (v >> 31)).toLong & 0xffffffffL
  private def zig64(v: Long): Long = (v << 1) ^ (v >> 63)
  private def unzig(v: Long): Long = (v >>> 1) ^ -(v & 1L)

  /** The wire type the schema (plus encoding hint) demands for a field's
    * single-value form; length-delimited types and packed arrays are 2.
    */
  private def scalarWire(dt: DataType, hint: String): Int = dt match {
    case IntegerType => if (hint == "fixed") 5 else 0
    case LongType => if (hint == "fixed") 1 else 0
    case BooleanType => 0
    case DoubleType => 1
    case FloatType => 5
    case _ => 2
  }

  /** Encode one InternalRow as a proto3 message (field numbers = ordinal
    * position + 1; proto3 default values omitted).
    */
  def encodeRow(row: InternalRow, schema: StructType): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    var i = 0
    while (i < schema.length) {
      val f = schema.fields(i)
      val num = i + 1
      if (!row.isNullAt(i)) f.dataType match {
        case IntegerType =>
          val v = row.getInt(i)
          // default `int32`: negative int32 encodes as the sign-extended
          // 64-bit varint (10 bytes); hints select sint32 / (s)fixed32
          if (v != 0) encodingHint(f) match {
            case "zigzag" => writeTag(out, num, 0); writeVarint(out, zig32(v))
            case "fixed" => writeTag(out, num, 5); writeFixed32(out, v)
            case _ => writeTag(out, num, 0); writeVarint(out, v.toLong)
          }
        case LongType =>
          val v = row.getLong(i)
          if (v != 0L) encodingHint(f) match {
            case "zigzag" => writeTag(out, num, 0); writeVarint(out, zig64(v))
            case "fixed" => writeTag(out, num, 1); writeFixed64(out, v)
            case _ => writeTag(out, num, 0); writeVarint(out, v)
          }
        case BooleanType =>
          if (row.getBoolean(i)) { writeTag(out, num, 0); writeVarint(out, 1L) }
        case DoubleType =>
          val v = row.getDouble(i)
          if (v != 0.0d || java.lang.Double.doubleToRawLongBits(v) != 0L) {
            writeTag(out, num, 1)
            writeFixed64(out, java.lang.Double.doubleToLongBits(v))
          }
        case FloatType =>
          val v = row.getFloat(i)
          if (v != 0.0f || java.lang.Float.floatToRawIntBits(v) != 0) {
            writeTag(out, num, 5)
            writeFixed32(out, java.lang.Float.floatToIntBits(v))
          }
        case StringType =>
          val b = row.getUTF8String(i).getBytes
          if (b.nonEmpty) writeLenDelim(out, num, b)
        case BinaryType =>
          val b = row.getBinary(i)
          if (b.nonEmpty) writeLenDelim(out, num, b)
        case ArrayType(et, _) =>
          encodeArray(out, num, row.getArray(i), et, encodingHint(f))
        // proto3 map<K,V>: repeated message { K key = 1; V value = 2; }
        case MapType(kt, vt, _) =>
          val m = row.getMap(i)
          val keys = m.keyArray()
          val vals = m.valueArray()
          var j = 0
          while (j < m.numElements()) {
            val entry = new ByteArrayOutputStream()
            writeScalarField(entry, 1, keys, j, kt)
            writeScalarField(entry, 2, vals, j, vt)
            writeLenDelim(out, num, entry.toByteArray)
            j += 1
          }
        case st: StructType =>
          writeLenDelim(out, num, encodeRow(row.getStruct(i, st.length), st))
        case other => throw new IllegalArgumentException(
          s"unsupported type for protobuf: ${other.simpleString}")
      }
      i += 1
    }
    out.toByteArray
  }

  /** One scalar map-entry field (default values omitted, per spec).
    * proto3 has no null: a NULL map value encodes as the type's default
    * (omitted), the same folding the reference's row→proto converter
    * applies to nullable columns.
    */
  private def writeScalarField(out: ByteArrayOutputStream, num: Int,
      arr: ArrayData, j: Int, dt: DataType): Unit = if (!arr.isNullAt(j)) dt match {
    case IntegerType =>
      val v = arr.getInt(j)
      if (v != 0) { writeTag(out, num, 0); writeVarint(out, v.toLong) }
    case LongType =>
      val v = arr.getLong(j)
      if (v != 0L) { writeTag(out, num, 0); writeVarint(out, v) }
    case BooleanType =>
      if (arr.getBoolean(j)) { writeTag(out, num, 0); writeVarint(out, 1L) }
    case DoubleType =>
      val v = arr.getDouble(j)
      if (java.lang.Double.doubleToLongBits(v) != 0L) {
        writeTag(out, num, 1)
        writeFixed64(out, java.lang.Double.doubleToLongBits(v))
      }
    case FloatType =>
      val v = arr.getFloat(j)
      if (java.lang.Float.floatToIntBits(v) != 0) {
        writeTag(out, num, 5)
        writeFixed32(out, java.lang.Float.floatToIntBits(v))
      }
    case StringType =>
      val b = arr.getUTF8String(j).getBytes
      if (b.nonEmpty) writeLenDelim(out, num, b)
    case BinaryType =>
      val b = arr.getBinary(j)
      if (b.nonEmpty) writeLenDelim(out, num, b)
    case other => throw new IllegalArgumentException(
      s"unsupported map entry type for protobuf: ${other.simpleString}")
  }

  private def encodeArray(out: ByteArrayOutputStream, num: Int,
      arr: ArrayData, et: DataType, hint: String): Unit = et match {
    // packed repeated numerics: ONE length-delimited payload. proto3
    // has no null — a NULL element folds to the type's default value
    // (0/false), preserving the array's cardinality on round-trip.
    case IntegerType | LongType | BooleanType | DoubleType | FloatType =>
      if (arr.numElements() > 0) {
        val body = new ByteArrayOutputStream()
        var j = 0
        while (j < arr.numElements()) {
          val isNull = arr.isNullAt(j)
          et match {
            case IntegerType => hint match {
              case "zigzag" =>
                writeVarint(body, if (isNull) 0L else zig32(arr.getInt(j)))
              case "fixed" =>
                writeFixed32(body, if (isNull) 0 else arr.getInt(j))
              case _ =>
                writeVarint(body, if (isNull) 0L else arr.getInt(j).toLong)
            }
            case LongType => hint match {
              case "zigzag" =>
                writeVarint(body, if (isNull) 0L else zig64(arr.getLong(j)))
              case "fixed" =>
                writeFixed64(body, if (isNull) 0L else arr.getLong(j))
              case _ =>
                writeVarint(body, if (isNull) 0L else arr.getLong(j))
            }
            case BooleanType =>
              writeVarint(body, if (!isNull && arr.getBoolean(j)) 1L else 0L)
            case DoubleType =>
              writeFixed64(body, if (isNull) 0L
                else java.lang.Double.doubleToLongBits(arr.getDouble(j)))
            case FloatType =>
              writeFixed32(body, if (isNull) 0
                else java.lang.Float.floatToIntBits(arr.getFloat(j)))
            case _ => ()
          }
          j += 1
        }
        writeLenDelim(out, num, body.toByteArray)
      }
    // repeated strings/bytes: one length-delimited field per element;
    // NULL elements fold to the empty default, keeping cardinality
    case StringType =>
      var j = 0
      while (j < arr.numElements()) {
        writeLenDelim(out, num,
          if (arr.isNullAt(j)) Array.emptyByteArray
          else arr.getUTF8String(j).getBytes)
        j += 1
      }
    case BinaryType =>
      var j = 0
      while (j < arr.numElements()) {
        writeLenDelim(out, num,
          if (arr.isNullAt(j)) Array.emptyByteArray else arr.getBinary(j))
        j += 1
      }
    case st: StructType =>
      var j = 0
      while (j < arr.numElements()) {
        writeLenDelim(out, num,
          if (arr.isNullAt(j)) Array.emptyByteArray
          else encodeRow(arr.getStruct(j, st.length), st))
        j += 1
      }
    case other => throw new IllegalArgumentException(
      s"unsupported repeated type for protobuf: ${other.simpleString}")
  }

  // ------------------------------------------------------------ decoding

  private final class Reader(bytes: Array[Byte], var pos: Int, val end: Int) {
    def hasMore: Boolean = pos < end
    // every read enforces the span's END: a truncated length-delimited
    // field must fail loudly, not zero-pad, and a nested message must
    // never read its parent's following bytes as its own fields
    // `n > end - pos` (not `pos + n > end`): the latter overflows Int
    // for a huge claimed length and silently PASSES the check
    private def ensure(n: Int): Unit =
      if (n < 0 || n > end - pos) throw new IllegalArgumentException(
        s"truncated protobuf: need $n bytes at $pos, span ends at $end")
    /** Length prefix as a bounds-checked Int (a 64-bit varint length
      * must fail loudly, not truncate to a small Int and misparse).
      */
    private def readLen(): Int = {
      val l = readVarint()
      if (l < 0 || l > Int.MaxValue) throw new IllegalArgumentException(
        s"malformed protobuf length $l")
      l.toInt
    }
    def readVarint(): Long = {
      var shift = 0
      var result = 0L
      while (shift < 64) {
        ensure(1)
        val b = bytes(pos); pos += 1
        result |= (b & 0x7fL) << shift
        if ((b & 0x80) == 0) return result
        shift += 7
      }
      throw new IllegalArgumentException("malformed varint")
    }
    def readFixed64(): Long = {
      ensure(8)
      var v = 0L
      var i = 0
      while (i < 8) { v |= (bytes(pos + i) & 0xffL) << (8 * i); i += 1 }
      pos += 8; v
    }
    def readFixed32(): Int = {
      ensure(4)
      var v = 0
      var i = 0
      while (i < 4) { v |= (bytes(pos + i) & 0xff) << (8 * i); i += 1 }
      pos += 4; v
    }
    def readBytes(): Array[Byte] = {
      val len = readLen()
      ensure(len)
      val out = java.util.Arrays.copyOfRange(bytes, pos, pos + len)
      pos += len; out
    }
    def sub(): Reader = {
      val len = readLen()
      ensure(len)
      val r = new Reader(bytes, pos, pos + len)
      pos += len; r
    }
    def skip(wire: Int): Unit = wire match {
      case 0 => readVarint()
      case 1 => ensure(8); pos += 8
      case 2 => val len = readLen(); ensure(len); pos += len
      case 5 => ensure(4); pos += 4
      case w => throw new IllegalArgumentException(s"unsupported wire type $w")
    }
  }

  /** Decode one proto3 message into an InternalRow of `schema` (absent
    * fields take proto3 defaults: 0 / false / "" / empty).
    */
  def decodeRow(bytes: Array[Byte], schema: StructType): InternalRow =
    decodeMessage(new Reader(bytes, 0, bytes.length), schema)

  private def decodeMessage(r: Reader, schema: StructType): InternalRow = {
    val values = new Array[Any](schema.length)
    val repeated = Array.fill(schema.length)(
      null: scala.collection.mutable.ArrayBuffer[Any])
    // proto3 defaults up front; later occurrences of a field overwrite
    // ("last one wins" for scalars, append for repeated)
    var i = 0
    while (i < schema.length) {
      values(i) = schema.fields(i).dataType match {
        case IntegerType => 0
        case LongType => 0L
        case BooleanType => false
        case DoubleType => 0.0d
        case FloatType => 0.0f
        case StringType => UTF8String.EMPTY_UTF8
        case BinaryType => Array.emptyByteArray
        case _: ArrayType => null // filled from `repeated` at the end
        case _: MapType => null // filled from `repeated` at the end
        case _: StructType => null // absent message decodes to null
        case other => throw new IllegalArgumentException(
          s"unsupported type for protobuf: ${other.simpleString}")
      }
      i += 1
    }
    // split singular submessages merge (the spec's rule: concatenating
    // encodings merges the messages) — occurrences buffer raw bytes
    // here and decode as ONE span at materialization
    val structBufs = new Array[ByteArrayOutputStream](schema.length)
    while (r.hasMore) {
      val tag = r.readVarint()
      val num = (tag >>> 3).toInt
      val wire = (tag & 7).toInt
      val idx = num - 1
      if (idx < 0 || idx >= schema.length) r.skip(wire)
      else {
        val f = schema.fields(idx)
        val hint = encodingHint(f)
        // wire-type contract: an in-schema tag whose wire type
        // contradicts the declared type fails loudly (the same error
        // class as truncation) instead of misparsing what follows
        val wireOk = f.dataType match {
          case ArrayType(et, _) => wire == 2 || wire == scalarWire(et, hint)
          case dt => wire == scalarWire(dt, hint)
        }
        if (!wireOk) throw new IllegalArgumentException(
          s"protobuf wire type $wire contradicts declared type " +
            s"${f.dataType.simpleString} for field $num")
        f.dataType match {
          case IntegerType => values(idx) = hint match {
            case "zigzag" => unzig(r.readVarint()).toInt
            case "fixed" => r.readFixed32()
            case _ => r.readVarint().toInt
          }
          case LongType => values(idx) = hint match {
            case "zigzag" => unzig(r.readVarint())
            case "fixed" => r.readFixed64()
            case _ => r.readVarint()
          }
          case BooleanType => values(idx) = r.readVarint() != 0L
          case DoubleType =>
            values(idx) = java.lang.Double.longBitsToDouble(r.readFixed64())
          case FloatType =>
            values(idx) = java.lang.Float.intBitsToFloat(r.readFixed32())
          case StringType => values(idx) = UTF8String.fromBytes(r.readBytes())
          case BinaryType => values(idx) = r.readBytes()
          case _: StructType =>
            if (structBufs(idx) == null)
              structBufs(idx) = new ByteArrayOutputStream()
            val b = r.readBytes()
            structBufs(idx).write(b, 0, b.length)
          case MapType(kt, vt, _) =>
            if (repeated(idx) == null)
              repeated(idx) = scala.collection.mutable.ArrayBuffer.empty[Any]
            // each entry is a mini message { key = 1; value = 2 } —
            // decode with a synthetic 2-field schema; later duplicate
            // keys win at materialization (proto3 map merge rule)
            val entrySchema = StructType(Seq(
              StructField("key", kt), StructField("value", vt)))
            val entry = decodeMessage(r.sub(), entrySchema)
            repeated(idx) += ((entry.get(0, kt), entry.get(1, vt)))
          case ArrayType(et, _) =>
            if (repeated(idx) == null)
              repeated(idx) = scala.collection.mutable.ArrayBuffer.empty[Any]
            val buf = repeated(idx)
            et match {
              case IntegerType | LongType | BooleanType | DoubleType | FloatType
                  if wire == 2 =>
                // packed payload: decode elements until the span ends
                val s = r.sub()
                while (s.hasMore) buf += readScalar(s, et, hint)
              case IntegerType | LongType | BooleanType | DoubleType | FloatType =>
                buf += readScalar(r, et, hint) // unpacked numeric
              case StringType => buf += UTF8String.fromBytes(r.readBytes())
              case BinaryType => buf += r.readBytes()
              case st: StructType => buf += decodeMessage(r.sub(), st)
              case other => throw new IllegalArgumentException(
                s"unsupported repeated type for protobuf: ${other.simpleString}")
            }
        }
      }
    }
    i = 0
    while (i < schema.length) {
      schema.fields(i).dataType match {
        case st: StructType if structBufs(i) != null =>
          val b = structBufs(i).toByteArray
          values(i) = decodeMessage(new Reader(b, 0, b.length), st)
        case _: ArrayType =>
          values(i) = new GenericArrayData(
            Option(repeated(i)).map(_.toArray).getOrElse(Array.empty[Any]))
        case _: MapType =>
          // last entry wins per key (proto3 map merge rule)
          val pairs = Option(repeated(i)).map(_.toSeq).getOrElse(Seq.empty)
            .asInstanceOf[Seq[(Any, Any)]]
          val merged = scala.collection.mutable.LinkedHashMap.empty[Any, Any]
          pairs.foreach { case (k, v) => merged(k) = v }
          values(i) = org.apache.spark.sql.catalyst.util.ArrayBasedMapData(
            merged.keys.toArray, merged.values.toArray)
        case _ => ()
      }
      i += 1
    }
    InternalRow.fromSeq(values.toIndexedSeq)
  }

  private def readScalar(r: Reader, et: DataType, hint: String): Any =
    et match {
      case IntegerType => hint match {
        case "zigzag" => unzig(r.readVarint()).toInt
        case "fixed" => r.readFixed32()
        case _ => r.readVarint().toInt
      }
      case LongType => hint match {
        case "zigzag" => unzig(r.readVarint())
        case "fixed" => r.readFixed64()
        case _ => r.readVarint()
      }
      case BooleanType => r.readVarint() != 0L
      case DoubleType => java.lang.Double.longBitsToDouble(r.readFixed64())
      case FloatType => java.lang.Float.intBitsToFloat(r.readFixed32())
      case _ => throw new IllegalArgumentException("not a scalar")
    }
}

/** struct → proto3 wire bytes (field numbers from ordinal position). */
case class PbEncode(child: Expression)
    extends UnaryExpression with CodegenFallback {
  private lazy val structType = child.dataType.asInstanceOf[StructType]
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_to_protobuf"
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case _: StructType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"to_protobuf needs a struct input, got ${other.simpleString}")
    }
  override protected def nullSafeEval(input: Any): Any =
    ProtobufWire.encodeRow(input.asInstanceOf[InternalRow], structType)
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** proto3 wire bytes → struct of `schema`. */
case class PbDecode(child: Expression, schema: StructType)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = schema
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_from_protobuf"
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case BinaryType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"from_protobuf needs a binary input, got ${other.simpleString}")
    }
  override protected def nullSafeEval(input: Any): Any =
    ProtobufWire.decodeRow(input.asInstanceOf[Array[Byte]], schema)
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
