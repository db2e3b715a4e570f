package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.ArrayType

/** Mapping extraction: project (key, value) pairs out of records and dedup
  * by key with last-write-wins (SURVEY §2.3 P2 + §2.4 J5).
  *
  * Reference semantics (`src/data_processor.py:128-153`):
  *  - key = dot-path of `keyPath` (array fan-out → one pair per element);
  *  - null/empty keys skipped (`:138-139`);
  *  - single value field: wrapped `{field: v}`, record skipped when v is
  *    null (`:147-150`); multi value fields: struct of all fields, nulls
  *    kept (`:141-143`);
  *  - duplicate keys: the later record in file order wins (dict overwrite,
  *    `:153`).
  *
  * Spark has no implicit row order, so file order is pinned explicitly with
  * `monotonically_increasing_id()` taken at scan time (ids grow with
  * partition index, preserving the source row order of a single-file read)
  * and `max_by(value, seq)` — a partial-aggregating hash agg, no sort.
  */
object Mappings {

  /** Extract a mapping DataFrame (`key: String`, `value: struct<...>`). */
  def extract(df: DataFrame, keyPath: String, valueFields: Seq[String], singleValue: Boolean): DataFrame = {
    val withSeq = df.withColumn("__seq", monotonically_increasing_id())
    val keyCol = DotPath.resolve(df, keyPath)
    val keyed = DotPath.resolvedType(df.schema, keyPath) match {
      case Some(_: ArrayType) => withSeq.withColumn("__key", explode(keyCol))
      case _                  => withSeq.withColumn("__key", keyCol)
    }
    val valueStruct = struct(valueFields.map(f => DotPath.resolve(df, f).as(f)): _*)
    val pairs = keyed
      .where(col("__key").isNotNull && col("__key") =!= "")
      .withColumn("__value", valueStruct)
    val filtered =
      if (singleValue) pairs.where(col("__value").getField(valueFields.head).isNotNull)
      else pairs
    filtered
      .groupBy(col("__key").as("key"))
      .agg(max_by(col("__value"), col("__seq")).as("value"))
  }
}
