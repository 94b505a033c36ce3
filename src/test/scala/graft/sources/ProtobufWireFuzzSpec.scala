package graft.sources

import scala.util.Random

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.SparkSuite

/** Property fuzz for the hand-written proto3 wire codec
  * ([[ProtobufWire]]) — random schemas (scalars under all three wire
  * hints, packed repeated, maps, nested messages) and random rows
  * (extremes, negatives, multi-byte strings, nulls) through two
  * invariants the proto3 spec fixes:
  *
  *   1. ROUND-TRIP: decode(encode(row)) equals the row under proto3
  *      null folding (null scalar → default, null/empty repeated →
  *      empty, absent message → null — matching the codec's documented
  *      contract and the hand spec's fixed cases);
  *   2. CONCATENATION MERGE: decode(encode(a) ++ encode(b)) equals the
  *      spec's message merge — last-wins for present scalars, append
  *      for repeated, last-wins per key for maps, RECURSIVE merge for
  *      submessages (the split-submessage structBufs path).
  *
  * Seeds are SplitMix64-scrambled like every fuzz family in this repo.
  */
class ProtobufWireFuzzSpec extends SparkSuite {

  private def scramble(s: Long): Long =
    graft.queries.StreamFuzzGen.scramble(s)

  private def hintMeta(h: String) =
    new MetadataBuilder().putString(ProtobufWire.EncodingKey, h).build()

  private val hints = Seq("varint", "zigzag", "fixed")

  private def genScalarType(r: Random): (DataType, Metadata) =
    r.nextInt(6) match {
      case 0 => (IntegerType, hintMeta(hints(r.nextInt(3))))
      case 1 => (LongType, hintMeta(hints(r.nextInt(3))))
      case 2 => (BooleanType, Metadata.empty)
      case 3 => (DoubleType, Metadata.empty)
      case 4 => (FloatType, Metadata.empty)
      case 5 => (StringType, Metadata.empty)
    }

  private def genSchema(r: Random): StructType = {
    val n = 3 + r.nextInt(5)
    StructType((1 to n).map { i =>
      r.nextInt(9) match {
        case k if k <= 5 =>
          val (dt, m) = genScalarType(r)
          StructField(s"f$i", dt, nullable = true, m)
        case 6 =>
          val (et, m) = genScalarType(r)
          StructField(s"f$i", ArrayType(et), nullable = true, m)
        case 7 =>
          val (kt, vt) =
            if (r.nextBoolean()) (StringType, LongType)
            else (LongType, StringType)
          StructField(s"f$i", MapType(kt, vt), nullable = true)
        case 8 =>
          val inner = StructType((1 to 2 + r.nextInt(2)).map { j =>
            val (dt, m) = genScalarType(r)
            StructField(s"g$j", dt, nullable = true, m)
          })
          StructField(s"f$i", inner, nullable = true)
      }
    })
  }

  private val strings = Seq("", "a", "hello world", "käse", "数据库",
    "😀mix", "line\nbreak", "nul-free")

  private def genScalar(r: Random, dt: DataType): Any = dt match {
    case IntegerType =>
      Seq(0, 1, -1, 7, -128, Int.MaxValue, Int.MinValue,
        r.nextInt())(r.nextInt(8))
    case LongType =>
      Seq(0L, 1L, -1L, 300L, Long.MaxValue, Long.MinValue,
        r.nextLong())(r.nextInt(7))
    case BooleanType => r.nextBoolean()
    case DoubleType =>
      Seq(0.0d, -0.0d, 1.5d, -2.25e10d, r.nextDouble())(r.nextInt(5))
    case FloatType =>
      Seq(0.0f, -0.0f, 3.5f, r.nextFloat())(r.nextInt(4))
    case StringType => UTF8String.fromString(strings(r.nextInt(strings.length)))
  }

  private def genValue(r: Random, dt: DataType): Any = dt match {
    case ArrayType(et, _) =>
      new GenericArrayData((0 until r.nextInt(5)).map { _ =>
        if (r.nextInt(8) == 0) null else genScalar(r, et)
      }.toArray[Any])
    case MapType(kt, vt, _) =>
      val ks = scala.collection.mutable.LinkedHashSet.empty[Any]
      (0 until r.nextInt(4)).foreach(_ => ks += genScalar(r, kt))
      val keys = ks.toArray
      ArrayBasedMapData(keys, keys.map(_ => genScalar(r, vt)))
    case st: StructType =>
      InternalRow.fromSeq(st.fields.toSeq.map(f =>
        if (r.nextInt(5) == 0) null else genScalar(r, f.dataType)))
    case dt => genScalar(r, dt)
  }

  private def genRow(r: Random, schema: StructType): InternalRow =
    InternalRow.fromSeq(schema.fields.toSeq.map(f =>
      if (r.nextInt(6) == 0) null else genValue(r, f.dataType)))

  // ---- canonical rendering (bit-exact doubles, ordered maps sorted)

  private def defaultOf(dt: DataType): Any = dt match {
    case IntegerType => 0
    case LongType => 0L
    case BooleanType => false
    case DoubleType => 0.0d
    case FloatType => 0.0f
    case StringType => UTF8String.EMPTY_UTF8
    case _ => null
  }

  private def canonScalar(v: Any, dt: DataType): String = dt match {
    case DoubleType =>
      "d:" + java.lang.Double.doubleToLongBits(v.asInstanceOf[Double])
    case FloatType =>
      "f:" + java.lang.Float.floatToIntBits(v.asInstanceOf[Float])
    case _ => String.valueOf(v)
  }

  /** Render a DECODED value canonically. */
  private def canonDecoded(v: Any, dt: DataType): String = dt match {
    case ArrayType(et, _) =>
      val a = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      (0 until a.numElements()).map(i =>
        canonScalar(a.get(i, et), et)).mkString("[", ",", "]")
    case MapType(kt, vt, _) =>
      val m = v.asInstanceOf[org.apache.spark.sql.catalyst.util.MapData]
      val ks = m.keyArray(); val vs = m.valueArray()
      (0 until m.numElements()).map(i =>
        canonScalar(ks.get(i, kt), kt) + "->" + canonScalar(vs.get(i, vt), vt))
        .sorted.mkString("{", ",", "}")
    case st: StructType =>
      if (v == null) "null"
      else {
        val row = v.asInstanceOf[InternalRow]
        st.fields.zipWithIndex.map { case (f, i) =>
          canonScalar(row.get(i, f.dataType), f.dataType)
        }.mkString("(", ",", ")")
      }
    case dt => canonScalar(v, dt)
  }

  /** Render an INPUT value as its expected proto3 round-trip image:
    * null scalars → defaults, null array elements → defaults, null
    * array/map → empty, null struct → null, struct fields → defaults.
    */
  private def canonExpected(v: Any, dt: DataType): String = dt match {
    case ArrayType(et, _) =>
      if (v == null) "[]"
      else {
        val a = v.asInstanceOf[GenericArrayData]
        (0 until a.numElements()).map { i =>
          val e = a.get(i, et)
          canonScalar(if (e == null) defaultOf(et) else e, et)
        }.mkString("[", ",", "]")
      }
    case MapType(kt, vt, _) =>
      if (v == null) "{}"
      else {
        val m = v.asInstanceOf[org.apache.spark.sql.catalyst.util.MapData]
        val ks = m.keyArray(); val vs = m.valueArray()
        (0 until m.numElements()).map { i =>
          val mv = vs.get(i, vt)
          canonScalar(ks.get(i, kt), kt) + "->" +
            canonScalar(if (mv == null) defaultOf(vt) else mv, vt)
        }.sorted.mkString("{", ",", "}")
      }
    case st: StructType =>
      if (v == null) "null"
      else {
        val row = v.asInstanceOf[InternalRow]
        st.fields.zipWithIndex.map { case (f, i) =>
          val fv = row.get(i, f.dataType)
          canonScalar(if (fv == null) defaultOf(f.dataType) else fv,
            f.dataType)
        }.mkString("(", ",", ")")
      }
    case dt => canonScalar(if (v == null) defaultOf(dt) else v, dt)
  }

  test("random schemas and rows round-trip under proto3 null folding") {
    for (seed <- 1L to 40L) {
      val r = new Random(scramble(seed))
      val schema = genSchema(r)
      for (_ <- 1 to 15) {
        val row = genRow(r, schema)
        val decoded =
          ProtobufWire.decodeRow(ProtobufWire.encodeRow(row, schema), schema)
        schema.fields.zipWithIndex.foreach { case (f, i) =>
          val exp = canonExpected(row.get(i, f.dataType), f.dataType)
          val got = canonDecoded(decoded.get(i, f.dataType), f.dataType)
          assert(got == exp,
            s"seed $seed field ${f.name}: ${f.dataType.simpleString} " +
              s"hint=${if (f.metadata.contains(ProtobufWire.EncodingKey))
                f.metadata.getString(ProtobufWire.EncodingKey) else "-"} " +
              s"expected $exp, decoded $got")
        }
      }
    }
  }

  test("concatenated encodings decode as the proto3 message merge") {
    // spec rule: parsing the concatenation of two encodings merges the
    // messages — later PRESENT scalars win, repeated fields append,
    // map entries last-win per key, submessages merge recursively
    def isPresent(v: Any, dt: DataType): Boolean = dt match {
      case _ if v == null => false
      case IntegerType => v != 0
      case LongType => v != 0L
      case BooleanType => v == true
      case DoubleType =>
        java.lang.Double.doubleToRawLongBits(v.asInstanceOf[Double]) != 0L
      case FloatType =>
        java.lang.Float.floatToRawIntBits(v.asInstanceOf[Float]) != 0
      case StringType => v.asInstanceOf[UTF8String].numBytes() > 0
      case _ => true
    }
    def mergedExpected(a: Any, b: Any, dt: DataType): String = dt match {
      case ArrayType(et, _) =>
        // merge at the VALUE level — string surgery on the rendered
        // form conflated an empty array with a one-empty-string array
        def elems(v: Any): Seq[String] =
          if (v == null) Nil
          else {
            val arr = v.asInstanceOf[GenericArrayData]
            (0 until arr.numElements()).map { i =>
              val e = arr.get(i, et)
              canonScalar(if (e == null) defaultOf(et) else e, et)
            }
          }
        (elems(a) ++ elems(b)).mkString("[", ",", "]")
      case MapType(kt, vt, _) =>
        def pairs(v: Any): Seq[(String, String)] =
          if (v == null) Nil
          else {
            val m = v.asInstanceOf[org.apache.spark.sql.catalyst.util.MapData]
            val ks = m.keyArray(); val vs = m.valueArray()
            (0 until m.numElements()).map { i =>
              val mv = vs.get(i, vt)
              (canonScalar(ks.get(i, kt), kt),
                canonScalar(if (mv == null) defaultOf(vt) else mv, vt))
            }
          }
        val merged = scala.collection.mutable.LinkedHashMap.empty[String, String]
        (pairs(a) ++ pairs(b)).foreach { case (k, v) => merged(k) = v }
        merged.toSeq.map { case (k, v) => s"$k->$v" }.sorted
          .mkString("{", ",", "}")
      case st: StructType =>
        (a, b) match {
          case (null, null) => "null"
          case (av, null) => canonExpected(av, st)
          case (null, bv) => canonExpected(bv, st)
          case (av: InternalRow, bv: InternalRow) =>
            st.fields.zipWithIndex.map { case (f, i) =>
              val x = av.get(i, f.dataType); val y = bv.get(i, f.dataType)
              if (isPresent(y, f.dataType)) canonExpected(y, f.dataType)
              else canonExpected(x, f.dataType)
            }.mkString("(", ",", ")")
        }
      case dt =>
        if (isPresent(b, dt)) canonExpected(b, dt) else canonExpected(a, dt)
    }
    for (seed <- 1L to 20L) {
      val r = new Random(scramble(seed ^ 0x6e46eL))
      val schema = genSchema(r)
      for (_ <- 1 to 8) {
        val a = genRow(r, schema)
        val b = genRow(r, schema)
        val cat = ProtobufWire.encodeRow(a, schema) ++
          ProtobufWire.encodeRow(b, schema)
        val decoded = ProtobufWire.decodeRow(cat, schema)
        schema.fields.zipWithIndex.foreach { case (f, i) =>
          val exp = mergedExpected(a.get(i, f.dataType), b.get(i, f.dataType),
            f.dataType)
          val got = canonDecoded(decoded.get(i, f.dataType), f.dataType)
          assert(got == exp,
            s"seed $seed merge field ${f.name} " +
              s"(${f.dataType.simpleString}): expected $exp, decoded $got")
        }
      }
    }
  }
}
