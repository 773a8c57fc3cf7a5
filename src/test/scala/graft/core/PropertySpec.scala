package graft.core

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.apache.spark.sql.types._
import scala.collection.immutable.ListMap

/** Generative properties for the pure core logic — the codec and lattice
  * laws the example-based specs can't sweep: arbitrary strings through
  * the TOML codec, lattice algebra over random type pairs/triples,
  * interval strings, size formatting invariants. */
class PropertySpec extends AnyFunSuite {

  private def check(p: Prop, tests: Int = 200): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(tests), p)
    assert(res.passed, res.status.toString)
  }

  // ------------------------------------------------------------ TOML
  private val scalarGen: Gen[Toml.Value] = Gen.oneOf(
    Gen.asciiPrintableStr.map(Toml.Str),
    // strings with the characters the escaper must handle
    Gen.listOf(Gen.oneOf('a', '"', '\\', '\n', '\t', '\r', ' ', 'é', '=', '[', ']'))
      .map(cs => Toml.Str(cs.mkString)),
    Gen.chooseNum(Long.MinValue, Long.MaxValue).map(Toml.Int64),
    Gen.oneOf(true, false).map(Toml.Bool),
    Gen.chooseNum(-1e12, 1e12).map(Toml.Num))

  private val keyGen: Gen[String] = Gen.oneOf(
    Gen.identifier.suchThat(_.nonEmpty),
    Gen.oneOf("has space", "quo\"te", "back\\slash", "dotted.key", "tab\tkey"))

  private val tblGen: Gen[Toml.Tbl] = for {
    scalars <- Gen.mapOfN(3, Gen.zip(keyGen, scalarGen))
    subKeys <- Gen.listOfN(2, keyGen)
    subScalars <- Gen.listOfN(2, Gen.mapOfN(2, Gen.zip(keyGen, scalarGen)))
  } yield Toml.Tbl(ListMap(
    (scalars.toSeq ++ subKeys.distinct.zip(subScalars.map(m =>
      Toml.Tbl(ListMap(m.toSeq: _*)): Toml.Value))): _*))

  private def norm(v: Toml.Value): Any = v match {
    case Toml.Tbl(m) => m.map { case (k, x) => k -> norm(x) }.toMap
    case Toml.Num(d) => ("num", d)
    case other => other
  }

  test("TOML render→parse round-trips tables with hostile keys and strings") {
    check(Prop.forAll(tblGen) { t =>
      norm(Toml.parse(Toml.render(t))) == norm(t)
    })
  }

  // ------------------------------------------------ SchemaUnify lattice
  private val leafGen: Gen[DataType] = Gen.oneOf(
    ByteType, ShortType, IntegerType, LongType, FloatType, DoubleType,
    StringType, BooleanType, DateType, TimestampType)

  private val typeGen: Gen[DataType] = Gen.frequency(
    6 -> leafGen,
    1 -> leafGen.map(t => ArrayType(t, containsNull = false)),
    1 -> Gen.zip(leafGen, leafGen).map { case (k, v) => MapType(k, v) },
    1 -> Gen.zip(leafGen, leafGen).map { case (a, b) =>
      StructType(Seq(StructField("x", a), StructField("y", b))) })

  test("promote is idempotent, commutative, and upper-bounding") {
    check(Prop.forAll(typeGen, typeGen) { (a, b) =>
      val ab = SchemaUnify.promote(a, b)
      SchemaUnify.promote(a, a) == a &&
        ab == SchemaUnify.promote(b, a) &&
        SchemaUnify.promote(ab, a) == ab &&
        SchemaUnify.promote(ab, b) == ab
    })
  }

  test("promote is associative (fold order can't change the unified schema)") {
    check(Prop.forAll(typeGen, typeGen, typeGen) { (a, b, c) =>
      SchemaUnify.promote(SchemaUnify.promote(a, b), c) ==
        SchemaUnify.promote(a, SchemaUnify.promote(b, c))
    })
  }

  test("unifyAll reports equal=true iff all schemas are identical") {
    check(Prop.forAll(Gen.listOfN(3, typeGen)) { ts =>
      val schemas = ts.map(t => StructType(Seq(StructField("a", t))))
      SchemaUnify.unifyAll(schemas)._2 == (schemas.distinct.size == 1)
    })
  }

  // --------------------------------------------------- IntervalParse
  test("interval strings parse consistently across unit spellings") {
    val spellings = Seq(
      ("s", "second", "seconds"), ("min", "minute", "minutes"),
      ("h", "hour", "hours"), ("d", "day", "days"), ("w", "week", "weeks"))
    check(Prop.forAll(Gen.chooseNum(1, 10000), Gen.oneOf(spellings)) { (n, sp) =>
      val parsed = Seq(sp._1, sp._2, sp._3).map(u => IntervalParse.parse(s"$n$u"))
      (parsed.distinct.size == 1) && parsed.head.micros > 0 && !parsed.head.isCalendar
    })
    check(Prop.forAll(Gen.chooseNum(1, 100)) { n =>
      IntervalParse.parse(s"${n}y") == IntervalParse.parse(s"${12 * n}months") &&
        IntervalParse.parse(s"$n month").isCalendar
    })
  }

  // ------------------------------------------------------- SizeUnits
  test("humanize output is well-formed and unit-monotone") {
    val fmt = """(\d+ B|\d+(\.\d)? (KB|MB|GB|TB|PB))""".r
    check(Prop.forAll(Gen.chooseNum(0L, Long.MaxValue / 2)) { b =>
      fmt.matches(SizeUnits.humanize(b))
    })
    val unitRank = Seq("B", "KB", "MB", "GB", "TB", "PB").zipWithIndex.toMap
    check(Prop.forAll(
      Gen.chooseNum(0L, Long.MaxValue / 4), Gen.chooseNum(0L, Long.MaxValue / 4)) { (x, y) =>
      val (lo, hi) = if (x <= y) (x, y) else (y, x)
      unitRank(SizeUnits.humanize(lo).split(' ').last) <=
        unitRank(SizeUnits.humanize(hi).split(' ').last)
    })
  }
}
