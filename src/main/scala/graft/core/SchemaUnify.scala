package graft.core

import org.apache.spark.sql.types._

/** Schema unification via the reference's type-promotion lattice
  * (reference: `utils/dataset.py:8-50`, fold loop `109-130`):
  *
  *   int8 < int16 < int32 < int64 < float16 < float32 < float64 < string
  *
  * Spark has no float16, so the Spark lattice drops that rung. Unification
  * is a field-name union with rank promotion on conflicts; any conflict not
  * on the lattice promotes to the common printable supertype, string.
  *
  * This is analysis-time driver code, not a Catalyst rule (SURVEY §4.2):
  * at 100 TB the cost is reading N parquet footers, not data. Footer reads
  * are distributed over the cluster when the file count is large.
  */
object SchemaUnify {

  private val rank: Map[DataType, Int] = Map(
    ByteType -> 0, ShortType -> 1, IntegerType -> 2, LongType -> 3,
    FloatType -> 5, DoubleType -> 6, StringType -> 7)

  /** Promote two types to their least upper bound on the lattice.
    * Identical types pass through; structured types unify recursively;
    * anything unreconcilable promotes to string (the lattice top). */
  def promote(a: DataType, b: DataType): DataType = (a, b) match {
    case (x, y) if x == y => x
    case (x: DecimalType, y: DecimalType) =>
      val intDigits = math.max(x.precision - x.scale, y.precision - y.scale)
      val scale = math.max(x.scale, y.scale)
      // the lossless union can exceed Spark's 38-digit ceiling (e.g.
      // decimal(38,0) ∪ decimal(10,5) needs 43 digits); the constructor
      // would throw there, so the lattice promotes to its top instead —
      // string keeps every digit, which is the module's contract
      if (intDigits + scale > DecimalType.MAX_PRECISION) StringType
      else DecimalType(intDigits + scale, scale)
    case (x: StructType, y: StructType) => unify(x, y)._1
    case (ArrayType(x, n1), ArrayType(y, n2)) => ArrayType(promote(x, y), n1 || n2)
    case (MapType(k1, v1, n1), MapType(k2, v2, n2)) =>
      MapType(promote(k1, k2), promote(v1, v2), n1 || n2)
    case (TimestampType, DateType) | (DateType, TimestampType) => TimestampType
    case (TimestampNTZType, DateType) | (DateType, TimestampNTZType) => TimestampNTZType
    case (x, y) if rank.contains(x) && rank.contains(y) =>
      if (rank(x) >= rank(y)) x else y
    case _ => StringType
  }

  /** Unify two schemas: union of field names (order = fields of `a`, then
    * new fields of `b` in their order), types promoted on conflict.
    * Returns (unified, equal) where equal=false iff promotion or field
    * addition happened — the reference's `schemas_equal` flag. */
  def unify(a: StructType, b: StructType): (StructType, Boolean) = {
    val bByName = b.fields.map(f => f.name -> f).toMap
    val aNames = a.fieldNames.toSet
    var equal = a.length == b.length
    val merged = a.fields.map { fa =>
      bByName.get(fa.name) match {
        case Some(fb) =>
          val t = promote(fa.dataType, fb.dataType)
          if (t != fa.dataType || t != fb.dataType) equal = false
          StructField(fa.name, t, fa.nullable || fb.nullable)
        case None => equal = false; fa.copy(nullable = true)
      }
    } ++ b.fields.filterNot(f => aNames.contains(f.name)).map { f =>
      equal = false; f.copy(nullable = true)
    }
    (StructType(merged), equal)
  }

  /** Fold many per-file schemas into one unified schema. */
  def unifyAll(schemas: Seq[StructType]): (StructType, Boolean) =
    schemas match {
      case Seq() => (StructType(Nil), true)
      case head +: tail =>
        tail.foldLeft((head, true)) { case ((acc, eq), s) =>
          val (u, e) = unify(acc, s)
          (u, eq && e)
        }
    }

  /** Sort fields by name (reference `sort_schema`, utils/dataset.py:133-139). */
  def sorted(s: StructType): StructType = StructType(s.fields.sortBy(_.name))
}
