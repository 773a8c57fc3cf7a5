package graft.core

import java.time.Instant
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class SchemaUnifySpec extends AnyFunSuite {
  private val lattice = Seq(ByteType, ShortType, IntegerType, LongType, FloatType, DoubleType, StringType)

  test("promotion lattice pairs (mirrors utils/dataset.py:8-50)") {
    assert(SchemaUnify.promote(ByteType, LongType) == LongType)
    assert(SchemaUnify.promote(IntegerType, LongType) == LongType)
    assert(SchemaUnify.promote(LongType, FloatType) == FloatType)
    assert(SchemaUnify.promote(FloatType, DoubleType) == DoubleType)
    assert(SchemaUnify.promote(LongType, StringType) == StringType)
    assert(SchemaUnify.promote(DoubleType, StringType) == StringType)
    assert(SchemaUnify.promote(BooleanType, LongType) == StringType) // off-lattice → top
  }

  test("unify: field-name union with promotion") {
    val a = StructType(Seq(StructField("x", IntegerType), StructField("y", StringType)))
    val b = StructType(Seq(StructField("x", LongType), StructField("z", DoubleType)))
    val (u, equal) = SchemaUnify.unify(a, b)
    assert(!equal)
    assert(u.fieldNames.toSeq == Seq("x", "y", "z"))
    assert(u("x").dataType == LongType)
    assert(u("z").dataType == DoubleType)
  }

  test("unify: identical schemas are equal") {
    val a = StructType(Seq(StructField("x", IntegerType)))
    assert(SchemaUnify.unify(a, a)._2)
  }

  test("promote is commutative, associative, idempotent on the lattice (exhaustive)") {
    for (a <- lattice; b <- lattice; c <- lattice) {
      assert(SchemaUnify.promote(a, b) == SchemaUnify.promote(b, a))
      assert(SchemaUnify.promote(SchemaUnify.promote(a, b), c) ==
        SchemaUnify.promote(a, SchemaUnify.promote(b, c)))
      assert(SchemaUnify.promote(a, a) == a)
    }
  }

  test("decimal promotion past 38 digits goes to string, never a crashing DecimalType") {
    // decimal(38,0) ∪ decimal(10,5) needs 43 digits — the constructor
    // would throw; the lattice must promote to its top instead
    assert(SchemaUnify.promote(DecimalType(38, 0), DecimalType(10, 5)) == StringType)
    assert(SchemaUnify.promote(DecimalType(20, 2), DecimalType(10, 5)) == DecimalType(23, 5))
    assert(SchemaUnify.promote(DecimalType(38, 10), DecimalType(38, 10)) == DecimalType(38, 10))
  }

  test("unifyAll folds many schemas") {
    val ss = Seq(
      StructType(Seq(StructField("a", ByteType))),
      StructType(Seq(StructField("a", IntegerType), StructField("b", FloatType))),
      StructType(Seq(StructField("b", DoubleType), StructField("c", StringType))))
    val (u, equal) = SchemaUnify.unifyAll(ss)
    assert(!equal)
    assert(u("a").dataType == IntegerType)
    assert(u("b").dataType == DoubleType)
    assert(u("c").dataType == StringType)
  }
}

class IntervalParseSpec extends AnyFunSuite {
  test("parses reference unit spellings (writer.py:300-334)") {
    assert(IntervalParse.parse("10d") == IntervalParse.Interval(0, 10L * 86400000000L))
    assert(IntervalParse.parse("3months") == IntervalParse.Interval(3, 0))
    assert(IntervalParse.parse("1 hour") == IntervalParse.Interval(0, 3600000000L))
    assert(IntervalParse.parse("2y") == IntervalParse.Interval(24, 0))
    assert(IntervalParse.parse("90s") == IntervalParse.Interval(0, 90000000L))
    assert(IntervalParse.parse("500ms") == IntervalParse.Interval(0, 500000L))
  }
  test("rejects garbage") {
    intercept[IllegalArgumentException](IntervalParse.parse("abc"))
    intercept[IllegalArgumentException](IntervalParse.parse("10parsecs"))
  }
  test("sql rendering keeps sub-second intervals (no silent truncation to 0)") {
    assert(IntervalParse.parse("500ms").sql == "INTERVAL '0.500000' SECOND")
    assert(IntervalParse.parse("1500ms").sql == "INTERVAL '1.500000' SECOND")
    assert(IntervalParse.parse("90s").sql == "INTERVAL 90 SECOND")
  }
}

class NamingSpec extends AnyFunSuite {
  test("snapshot id round-trip (timefly.py:67-78)") {
    val t = Instant.parse("2022-10-01T13:05:13Z")
    val id = Naming.snapshotId(t)
    assert(id == "20221001_130513")
    assert(Naming.parseSnapshotId(id) == t)
  }
  test("time-travel resolution picks first strictly-after (timefly.py:337-352)") {
    val snaps = Seq("20220101_000000", "20220601_000000", "20230101_000000")
    assert(Naming.resolveSnapshot(snaps, Instant.parse("2022-03-01T00:00:00Z"))
      .contains("20220601_000000"))
    assert(Naming.resolveSnapshot(snaps, Instant.parse("2021-01-01T00:00:00Z"))
      .contains("20220101_000000"))
    // probe equal to a snapshot: strictly-after ⇒ next one
    assert(Naming.resolveSnapshot(snaps, Instant.parse("2022-06-01T00:00:00Z"))
      .contains("20230101_000000"))
    assert(Naming.resolveSnapshot(snaps, Instant.parse("2024-01-01T00:00:00Z")).isEmpty)
  }
  test("data file name shape (writer.py:141)") {
    val n = Naming.dataFileName("data", "parquet", Instant.parse("2022-10-01T13:05:13.123Z"))
    assert(n.matches("data-20221001_130513123-[a-z0-9]{8}\\.parquet"))
  }
}

class TomlSpec extends AnyFunSuite {
  test("trailing comments parse as TOML (hand-edited operator configs)") {
    val parsed = Toml.parse(
      """# full-line comment
        |[maintenance] # last checked by ops
        |count = 1 # a note
        |label = "keep # this" # but not this
        |flag = true# tight comment
        |""".stripMargin)
    val m = Toml.getTbl(parsed, "maintenance").get
    assert(m.v("count") == Toml.Int64(1), "comment must not leak into the value")
    assert(m.v("label") == Toml.Str("keep # this"), "# inside quotes is data")
    assert(m.v("flag") == Toml.Bool(true))
  }

  test("round-trips the reference config shape (test.toml)") {
    val t = Toml.Tbl(
      "dataset" -> Toml.Tbl(
        "name" -> Toml.Str("test"),
        "path" -> Toml.Str("/tmp/x"),
        "none_value" -> Toml.Str("None")),
      "current" -> Toml.Tbl(
        "format" -> Toml.Str("parquet"),
        "batch_size" -> Toml.Int64(1000000),
        "ascending" -> Toml.Bool(true),
        "sort_by" -> Toml.Arr(Seq(Toml.Str("a"), Toml.Str("b")))),
      "snapshot" -> Toml.Tbl(
        "available" -> Toml.Arr(Seq(Toml.Str("20221001_130513"))),
        "deleted" -> Toml.Arr(Nil),
        "20221001_130513" -> Toml.Tbl("created" -> Toml.Str("2022-10-01T13:05:13Z"))))
    val rendered = Toml.render(t)
    val parsed = Toml.parse(rendered)
    assert(Toml.getStr(Toml.getTbl(parsed, "dataset").get, "name").contains("test"))
    assert(Toml.getArr(Toml.getTbl(parsed, "snapshot").get, "available") == Seq("20221001_130513"))
    assert(Toml.getTbl(parsed, "snapshot", "20221001_130513").isDefined)
    assert(Toml.getTbl(parsed, "current").get.v("batch_size") == Toml.Int64(1000000))
    assert(Toml.getTbl(parsed, "current").get.v("ascending") == Toml.Bool(true))
  }

  test("array strings with escaped quotes and separators round-trip") {
    val t = Toml.Tbl("t" -> Toml.Tbl(
      "xs" -> Toml.Arr(Seq(Toml.Str("a\",b"), Toml.Str("c]d"), Toml.Str("plain")))))
    val parsed = Toml.parse(Toml.render(t))
    assert(Toml.getArr(Toml.getTbl(parsed, "t").get, "xs") == Seq("a\",b", "c]d", "plain"))
  }

  test("strings ending in a backslash round-trip (escaped-backslash quote rule)") {
    val t = Toml.Tbl("t" -> Toml.Tbl(
      "xs" -> Toml.Arr(Seq(Toml.Str("a\\"), Toml.Str("b"))),
      "k" -> Toml.Str("tail\\")))
    val parsed = Toml.parse(Toml.render(t))
    assert(Toml.getArr(Toml.getTbl(parsed, "t").get, "xs") == Seq("a\\", "b"))
    assert(Toml.getStr(Toml.getTbl(parsed, "t").get, "k").contains("tail\\"))
  }
}
