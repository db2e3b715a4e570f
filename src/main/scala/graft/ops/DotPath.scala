package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Dot-path nested field extraction with array fan-out (SURVEY §2.3 P1).
  *
  * Reproduces the reference's `_get_nested_field`
  * (`src/data_processor.py:157-178`): descend structs by name; on hitting an
  * array, map the remaining path over the elements and return an array.
  * `"spans.spanId"` over `array<struct<spanId,...>>` → `array<string>`.
  *
  * Spark's `col("a.b")` already implements one level of this natively; this
  * resolver walks the schema so arbitrarily deep struct/array nesting works
  * and a missing field yields a typed null column instead of an analysis
  * error (the reference returns None — `src/data_processor.py:176`).
  */
object DotPath {

  /** Resolve `path` against `df`'s schema. Missing fields → null literal. */
  def resolve(df: DataFrame, path: String): Column =
    resolveParts(df.schema, path.split('.').toList) match {
      case Some((c, _)) => c
      case None         => lit(null).cast(StringType)
    }

  /** Data type the resolved column will have, if the path exists. */
  def resolvedType(schema: StructType, path: String): Option[DataType] =
    resolveParts(schema, path.split('.').toList).map(_._2)

  private def resolveParts(schema: StructType, parts: List[String]): Option[(Column, DataType)] = {
    def descend(cur: Column, t: DataType, rest: List[String]): Option[(Column, DataType)] =
      (t, rest) match {
        case (_, Nil) => Some((cur, t))
        case (st: StructType, p :: tail) =>
          st.fields.find(_.name == p).flatMap(f => descend(cur.getField(p), f.dataType, tail))
        case (ArrayType(et, _), ps) =>
          // Array fan-out: map the remaining path over the elements
          // (reference `src/data_processor.py:171-173`).
          var elemType: Option[DataType] = None
          val mapped = transform(cur, x => {
            descend(x, et, ps) match {
              case Some((c, dt)) => elemType = Some(dt); c
              case None          => elemType = Some(StringType); lit(null).cast(StringType)
            }
          })
          elemType.map(dt => (mapped, ArrayType(dt)))
        case _ => None
      }
    parts match {
      case p :: tail =>
        schema.fields.find(_.name == p).flatMap(f => descend(col(p), f.dataType, tail))
      case Nil => None
    }
  }
}
