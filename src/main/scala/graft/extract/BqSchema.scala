package graft.extract

import org.apache.spark.sql.types._

/** Spark schema → BigQuery JSON schema mapping.
  *
  * Re-expresses reference pipeline.py:172-218 (`bq_schema`) over
  * Spark's type system instead of SQLAlchemy's: integers → INT64,
  * floating → FLOAT64, timestamp → DATETIME, decimal → INT64 /
  * NUMERIC / BIGNUMERIC by the same precision/scale rules, arrays →
  * REPEATED of the element type, unmapped → STRING.
  */
object BqSchema {

  final case class BqField(name: String, bqType: String, mode: String,
                           precision: Option[Int] = None, scale: Option[Int] = None)

  def mapType(dt: DataType): (String, Option[Int], Option[Int]) = dt match {
    case ByteType | ShortType | IntegerType | LongType => ("INT64", None, None)
    case FloatType | DoubleType                        => ("FLOAT64", None, None)
    case StringType                                    => ("STRING", None, None)
    case BooleanType                                   => ("BOOL", None, None)
    case BinaryType                                    => ("BYTES", None, None)
    case DateType                                      => ("DATE", None, None)
    // parquet TIMESTAMP(isAdjustedToUTC=false) reads as TIMESTAMP_NTZ
    case _: TimestampType | _: TimestampNTZType        => ("DATETIME", None, None)
    case d: DecimalType =>
      val (p, s) = (d.precision, d.scale)
      if (s == 0 && p <= 18) ("INT64", None, None)
      else if (s >= 0 && s <= 9 && math.max(s, 1) <= p && p <= s + 29)
        ("NUMERIC", Some(p), Some(s))
      else if (s >= 0 && s <= 38 && math.max(s, 1) <= p && p <= s + 38)
        ("BIGNUMERIC", Some(p), Some(s))
      else ("STRING", None, None)
    case _ => ("STRING", None, None)
  }

  /** normalize_str'd names + Nullable/Required/Repeated modes. */
  def fields(schema: StructType): Seq[BqField] = schema.fields.toSeq.map { f =>
    val name = graft.functions.GraftFunctions.normalizeStr(f.name)
    f.dataType match {
      case ArrayType(elem, _) =>
        val (t, p, s) = mapType(elem)
        BqField(name, t, "Repeated", p, s)
      case dt =>
        val (t, p, s) = mapType(dt)
        BqField(name, t, if (f.nullable) "Nullable" else "Required", p, s)
    }
  }

  /** BigQuery JSON schema document (reference pipeline.py:517-526). */
  def toJson(schema: StructType): String = {
    val entries = fields(schema).map { f =>
      val base = s"""{"name": "${f.name}", "mode": "${f.mode}", "type": "${f.bqType}""""
      val ps = (f.precision, f.scale) match {
        case (Some(p), Some(s)) => s""", "precision": $p, "scale": $s"""
        case _ => ""
      }
      base + ps + "}"
    }
    entries.mkString("[\n  ", ",\n  ", "\n]")
  }
}
