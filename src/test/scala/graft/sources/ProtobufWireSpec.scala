package graft.sources

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSuite

/** proto3 wire codec (sources/ProtobufWire): spec-pinned byte layouts
  * from the public protobuf encoding documentation, round-trip identity
  * across all supported types, proto3 default omission/fill, unknown
  * field skipping, and packed/unpacked repeated acceptance.
  */
class ProtobufWireSpec extends SparkSuite {
  import spark.implicits._

  private def enc(df: org.apache.spark.sql.DataFrame,
      cols: org.apache.spark.sql.Column): Array[Byte] =
    df.select(ProtobufWire.toProtobuf(cols).as("pb"))
      .head().getAs[Array[Byte]]("pb")

  test("canonical wire bytes: varint field, string field, packed repeated") {
    val one = Seq(1).toDF("x")
    // the protobuf docs' canonical example: field 1 = int 150 → 08 96 01
    val b1 = enc(one, struct(lit(150).as("a")))
    assert(b1.toSeq == Seq(0x08, 0x96.toByte, 0x01).map(_.toByte))
    // field 2 = string "testing" → 12 07 74 65 73 74 69 6e 67
    val b2 = enc(one, struct(lit(0).as("a"), lit("testing").as("b")))
    assert(b2.toSeq == (Seq(0x12, 0x07) ++
      "testing".getBytes("UTF-8").toSeq.map(_.toInt)).map(_.toByte))
    // packed repeated ints [3, 270, 86942] in field 4 →
    // 22 06 03 8E 02 9E A7 05 (the docs' packed example)
    val b3 = enc(one, struct(lit(0).as("a"), lit("").as("b"), lit(0L).as("c"),
      array(lit(3), lit(270), lit(86942)).as("d")))
    assert(b3.toSeq == Seq(0x22, 0x06, 0x03, 0x8e, 0x02, 0x9e, 0xa7, 0x05)
      .map(_.toByte))
  }

  test("proto3 default values are omitted on encode and filled on decode") {
    val sch = StructType(Seq(
      StructField("i", IntegerType), StructField("l", LongType),
      StructField("b", BooleanType), StructField("s", StringType),
      StructField("d", DoubleType), StructField("f", FloatType),
      StructField("bin", BinaryType)))
    val zeros = struct(lit(0).as("i"), lit(0L).as("l"), lit(false).as("b"),
      lit("").as("s"), lit(0.0d).as("d"), lit(0.0f).as("f"),
      lit(Array.emptyByteArray).as("bin"))
    val bytes = enc(Seq(1).toDF("x"), zeros)
    assert(bytes.isEmpty) // all defaults → empty message
    val back = Seq(1).toDF("x")
      .select(ProtobufWire.fromProtobuf(lit(Array.emptyByteArray), sch).as("m"))
      .select("m.*").head()
    assert(back.getInt(0) == 0 && back.getLong(1) == 0L &&
      !back.getBoolean(2) && back.getString(3) == "" &&
      back.getDouble(4) == 0.0 && back.getFloat(5) == 0.0f &&
      back.getAs[Array[Byte]](6).isEmpty)
  }

  test("round-trip identity across scalars, negatives, arrays, nesting") {
    val sch = StructType(Seq(
      StructField("i", IntegerType), StructField("l", LongType),
      StructField("b", BooleanType), StructField("s", StringType),
      StructField("d", DoubleType), StructField("f", FloatType),
      StructField("longs", ArrayType(LongType, containsNull = false)),
      StructField("strs", ArrayType(StringType, containsNull = false)),
      StructField("inner", StructType(Seq(
        StructField("x", LongType), StructField("y", StringType))))))
    val df = Seq(
      (-7, -900000000000L, true, "héllo", 2.5, -1.25f,
        Seq(0L, 5L, -3L), Seq("a", "", "c"), (42L, "n")),
      (2147483647, Long.MaxValue, false, "", 0.0, 3.5f,
        Seq.empty[Long], Seq.empty[String], (0L, ""))
    ).toDF("i", "l", "b", "s", "d", "f", "longs", "strs", "inner")
    val rows = df.select(ProtobufWire.toProtobuf(
        struct(df.columns.map(col).toSeq: _*)).as("pb"))
      .select(ProtobufWire.fromProtobuf(col("pb"), sch).as("m"))
      .select("m.*").collect()
    assert(rows(0) == Row(-7, -900000000000L, true, "héllo", 2.5, -1.25f,
      Seq(0L, 5L, -3L), Seq("a", "", "c"), Row(42L, "n")))
    // all-default inner message encodes as an EMPTY length-delimited
    // field (the field itself nonzero → present) → decodes to defaults
    assert(rows(1) == Row(2147483647, Long.MaxValue, false, "", 0.0, 3.5f,
      Seq.empty[Long], Seq.empty[String], Row(0L, "")))
  }

  test("unknown fields are skipped by wire type (forward compatibility)") {
    // encode with the WIDE schema, decode with a NARROW one — the extra
    // varint/len-delim/fixed fields must be skipped, not break framing
    val wide = struct(lit(9).as("a"), lit("drop").as("b"),
      lit(2.5d).as("c"), lit(7L).as("d"), lit(1.5f).as("e"))
    val bytes = enc(Seq(1).toDF("x"), wide)
    val narrow = StructType(Seq(StructField("a", IntegerType)))
    val r = Seq(1).toDF("x")
      .select(ProtobufWire.fromProtobuf(lit(bytes), narrow).as("m"))
      .select("m.*").head()
    assert(r.getInt(0) == 9)
    // decode with a schema having MORE fields than were written: the
    // absent tail takes proto3 defaults
    val wider = StructType(Seq(StructField("a", IntegerType),
      StructField("b", StringType), StructField("c", DoubleType),
      StructField("d", LongType), StructField("e", FloatType),
      StructField("f", LongType)))
    val r2 = Seq(1).toDF("x")
      .select(ProtobufWire.fromProtobuf(lit(bytes), wider).as("m"))
      .select("m.*").head()
    assert(r2 == Row(9, "drop", 2.5d, 7L, 1.5f, 0L))
  }

  test("proto3 maps round-trip as repeated key/value entry messages") {
    val sch = StructType(Seq(
      StructField("tags", MapType(StringType, LongType)),
      StructField("scores", MapType(IntegerType, DoubleType))))
    val df = Seq((Map("a" -> 1L, "" -> 0L), Map(3 -> 2.5, 0 -> -1.0)))
      .toDF("tags", "scores")
    val r = df.select(ProtobufWire.toProtobuf(
        struct(col("tags"), col("scores"))).as("pb"))
      .select(ProtobufWire.fromProtobuf(col("pb"), sch).as("m"))
      .select("m.*").head()
    assert(r.getMap[String, Long](0) == Map("a" -> 1L, "" -> 0L))
    assert(r.getMap[Int, Double](1) == Map(3 -> 2.5, 0 -> -1.0))
    // duplicate keys in the wire stream merge LAST-wins (spec rule):
    // two entries for field 1 with key "k" → value of the second
    // entry bytes: 0a 05 0a 01 6b 10 01 | 0a 05 0a 01 6b 10 02
    val dup = Array(
      0x0a, 0x05, 0x0a, 0x01, 0x6b, 0x10, 0x01,
      0x0a, 0x05, 0x0a, 0x01, 0x6b, 0x10, 0x02).map(_.toByte)
    val one = StructType(Seq(StructField("m", MapType(StringType, LongType))))
    val got = Seq(1).toDF("x")
      .select(ProtobufWire.fromProtobuf(lit(dup), one).as("r"))
      .select("r.*").head()
    assert(got.getMap[String, Long](0) == Map("k" -> 2L))
  }

  test("SQL registration: to_protobuf / from_protobuf with a DDL schema literal") {
    ProtobufWire.register(spark)
    Seq((5L, "ok"), (9L, "")).toDF("k", "status")
      .createOrReplaceTempView("pb_sql_in")
    val rows = spark.sql(
      """SELECT m.k, m.status FROM (
        |  SELECT from_protobuf(to_protobuf(struct(k, status)),
        |                       'k BIGINT, status STRING') AS m
        |  FROM pb_sql_in) t ORDER BY m.k""".stripMargin)
      .as[(Long, String)].collect().toSeq
    assert(rows == Seq((5L, "ok"), (9L, "")))
    // non-literal schema argument is rejected loudly
    val e = intercept[Exception] {
      spark.sql("SELECT from_protobuf(to_protobuf(struct(k)), status) FROM pb_sql_in")
        .collect()
    }
    assert(e.getMessage.contains("string literal"))
  }

  test("NULL array elements fold to proto3 defaults, cardinality kept") {
    val sch = StructType(Seq(
      StructField("xs", ArrayType(LongType, containsNull = true)),
      StructField("ss", ArrayType(StringType, containsNull = true))))
    val df = Seq(1).toDF("x").select(
      array(lit(5L), lit(null).cast("long"), lit(7L)).as("xs"),
      array(lit("a"), lit(null).cast("string")).as("ss"))
    val r = df.select(ProtobufWire.toProtobuf(
        struct(col("xs"), col("ss"))).as("pb"))
      .select(ProtobufWire.fromProtobuf(col("pb"), sch).as("m"))
      .select("m.*").head()
    // proto3 has no null — elements come back as defaults, same length
    assert(r.getSeq[Long](0) == Seq(5L, 0L, 7L))
    assert(r.getSeq[String](1) == Seq("a", ""))
  }

  test("truncated wire bytes fail loudly instead of zero-padding") {
    // field 1 string claims len 10 but only 4 bytes follow
    val truncated = Array(0x0a, 0x0a, 0x61, 0x62, 0x63, 0x64).map(_.toByte)
    val sch = StructType(Seq(StructField("s", StringType)))
    val e = intercept[Exception] {
      Seq(1).toDF("x")
        .select(ProtobufWire.fromProtobuf(lit(truncated), sch).as("m"))
        .select("m.*").collect()
    }
    assert(e.getMessage.contains("truncated protobuf") ||
      Option(e.getCause).exists(_.getMessage.contains("truncated protobuf")))
    // a nested message's length must bound its reads: inner claims
    // len 2 but its string field claims len 5 (would read the parent's
    // trailing field as its own content without the bound)
    val crossing = Array(0x0a, 0x02, 0x0a, 0x05, 0x10, 0x07).map(_.toByte)
    val nested = StructType(Seq(StructField("m", StructType(Seq(
      StructField("s", StringType))))))
    val e2 = intercept[Exception] {
      Seq(1).toDF("x")
        .select(ProtobufWire.fromProtobuf(lit(crossing), nested).as("r"))
        .select("r.*").collect()
    }
    assert(e2.getMessage.contains("truncated protobuf") ||
      Option(e2.getCause).exists(_.getMessage.contains("truncated protobuf")))
    // a HUGE claimed length (0x7FFFFFFF) must not overflow the bounds
    // check into a silent empty decode
    val huge = Array(0x0a, 0xff, 0xff, 0xff, 0xff, 0x07).map(_.toByte)
    val e3 = intercept[Exception] {
      Seq(1).toDF("x")
        .select(ProtobufWire.fromProtobuf(lit(huge), nested).as("r"))
        .select("r.*").collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: msgs(x.getCause))
    assert(msgs(e3).exists(m => m != null &&
      (m.contains("truncated protobuf") || m.contains("malformed protobuf"))))
  }

  test("unpacked numeric encoding is accepted on decode (spec requirement)") {
    // hand-build field 1 repeated int64 written UNPACKED: 08 05 08 90 03
    val bytes = Array(0x08, 0x05, 0x08, 0x90, 0x03).map(_.toByte)
    val sch = StructType(Seq(
      StructField("xs", ArrayType(LongType, containsNull = false))))
    val r = Seq(1).toDF("x")
      .select(ProtobufWire.fromProtobuf(lit(bytes), sch).as("m"))
      .select("m.*").head()
    assert(r.getSeq[Long](0) == Seq(5L, 400L))
  }

  test("split singular submessages merge (proto3 concatenation rule)") {
    // standard encoders may split one submessage across occurrences;
    // the spec says the decode result equals decoding the concatenated
    // payloads. occurrence 1 sets inner.x=1, occurrence 2 sets inner.y=2
    val bytes = Array(0x0a, 0x02, 0x08, 0x01, 0x0a, 0x02, 0x10, 0x02)
      .map(_.toByte)
    val sch = StructType(Seq(StructField("a", StructType(Seq(
      StructField("x", IntegerType), StructField("y", IntegerType))))))
    val d = ProtobufWire.decodeRow(bytes, sch)
    val inner = d.getStruct(0, 2)
    assert(inner.getInt(0) == 1 && inner.getInt(1) == 2)
    // a scalar set in BOTH occurrences: the later one wins
    val bytes2 = Array(0x0a, 0x02, 0x08, 0x01, 0x0a, 0x02, 0x08, 0x05)
      .map(_.toByte)
    assert(ProtobufWire.decodeRow(bytes2, sch).getStruct(0, 2).getInt(0) == 5)
  }

  test("wire type contradicting the declared type fails loudly") {
    // field 1 carries a length-delimited payload but the schema says
    // BIGINT — must throw, not misparse the remaining bytes
    val bytes = Array(0x0a, 0x03, 0x61, 0x62, 0x63).map(_.toByte)
    val sch = StructType(Seq(StructField("l", LongType)))
    val e = intercept[IllegalArgumentException] {
      ProtobufWire.decodeRow(bytes, sch)
    }
    assert(e.getMessage.contains("contradicts declared type"))
    // fixed-hinted int expects wire 5; a varint occurrence must throw
    val zf = new MetadataBuilder()
      .putString(ProtobufWire.EncodingKey, "fixed").build()
    val schF = StructType(Seq(StructField("i", IntegerType, true, zf)))
    val e2 = intercept[IllegalArgumentException] {
      ProtobufWire.decodeRow(Array(0x08, 0x01).map(_.toByte), schF)
    }
    assert(e2.getMessage.contains("contradicts declared type"))
  }

  test("sint/fixed wire hints: three encodings of one logical column") {
    import org.apache.spark.sql.catalyst.InternalRow
    def m(enc: String) = new MetadataBuilder()
      .putString(ProtobufWire.EncodingKey, enc).build()
    val schVarint = StructType(Seq(
      StructField("i", IntegerType), StructField("l", LongType)))
    val schZig = StructType(Seq(
      StructField("i", IntegerType, true, m("zigzag")),
      StructField("l", LongType, true, m("zigzag"))))
    val schFixed = StructType(Seq(
      StructField("i", IntegerType, true, m("fixed")),
      StructField("l", LongType, true, m("fixed"))))
    val row = InternalRow(-2, -2L)
    // canonical zigzag (docs: -2 → 3): both fields one byte each
    val zb = ProtobufWire.encodeRow(row, schZig)
    assert(zb.toSeq == Seq(0x08, 0x03, 0x10, 0x03).map(_.toByte))
    // canonical fixed: wire 5 LE-4 for int32, wire 1 LE-8 for int64
    val fb = ProtobufWire.encodeRow(row, schFixed)
    assert(fb.toSeq == (Seq(0x0d, 0xfe, 0xff, 0xff, 0xff) ++ Seq(0x11) ++
      Seq(0xfe) ++ Seq.fill(7)(0xff)).map(_.toByte))
    // default int32/int64: ten-byte sign-extended varints
    val vb = ProtobufWire.encodeRow(row, schVarint)
    assert(vb.length == 22)
    // each encoding round-trips to the same logical value
    for ((b, s) <- Seq((vb, schVarint), (zb, schZig), (fb, schFixed))) {
      val d = ProtobufWire.decodeRow(b, s)
      assert(d.getInt(0) == -2 && d.getLong(1) == -2L)
    }
    // hints apply inside packed repeated payloads too
    val schArr = StructType(Seq(StructField("xs",
      ArrayType(IntegerType, containsNull = false), true, m("zigzag"))))
    val arrRow = InternalRow(
      new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array[Any](-1, 2, -3)))
    val ab = ProtobufWire.encodeRow(arrRow, schArr)
    // packed span: tag 0a, len 3, zigzags 1, 4, 5
    assert(ab.toSeq == Seq(0x0a, 0x03, 0x01, 0x04, 0x05).map(_.toByte))
    assert(ProtobufWire.decodeRow(ab, schArr)
      .getArray(0).toIntArray().toSeq == Seq(-1, 2, -3))
  }

  test("unrecognized pb.encoding hint fails loudly, never silent varint") {
    import org.apache.spark.sql.catalyst.InternalRow
    // a typo'd hint ("sint" for "zigzag") silently falling back to
    // varint would produce int32 wire format where sint32 was intended
    val sch = StructType(Seq(StructField("i", IntegerType, true,
      new MetadataBuilder()
        .putString(ProtobufWire.EncodingKey, "sint").build())))
    val e = intercept[IllegalArgumentException] {
      ProtobufWire.encodeRow(InternalRow(-2), sch)
    }
    assert(e.getMessage.contains("sint") && e.getMessage.contains("zigzag"))
    val d = intercept[IllegalArgumentException] {
      ProtobufWire.decodeRow(Array[Byte](0x08, 0x03), sch)
    }
    assert(d.getMessage.contains("pb.encoding"))
  }
}
