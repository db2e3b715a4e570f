package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Enrichment lookup join (SURVEY §2.4 J1).
  *
  * Reference semantics (`src/data_processor.py:100-112`): build a KV dict,
  * look up `record[keyField]`; on hit merge the mapping's fields into the
  * record (overwriting same-named fields — `item.update`); on miss or
  * null/empty key keep the record unchanged. All records are retained.
  *
  * Spark-first mapping: a broadcast left-outer hash join against the mapping
  * DataFrame, then a column-merge projection. The mapping side is by
  * construction bounded (it is a key→small-struct index), so `broadcast()`
  * keeps this a map-side join with zero shuffle of the fact side — the shape
  * that survives a 100 TB fact table.
  */
object Enrich {

  /** @param df       records to enrich
    * @param mapping  DataFrame with columns (`key: String`, `value: struct<...>`)
    * @param keyField  field of `df` whose value is looked up in `mapping.key`
    */
  def apply(df: DataFrame, mapping: DataFrame, keyField: String): DataFrame = {
    val valueFields = mapping.schema("value").dataType.asInstanceOf[StructType].fieldNames.toSeq
    val m = broadcast(mapping.select(col("key").as("__enrich_key"), col("value").as("__enrich_value")))
    // The reference skips records with a falsy key ("" or null) — they can
    // never match; a join condition mirrors that exactly.
    val joined = df.join(m, df(keyField) === col("__enrich_key"), "left")
    val hit = col("__enrich_key").isNotNull
    val merged: Seq[Column] = df.columns.toSeq.map { c =>
      if (valueFields.contains(c))
        when(hit, col("__enrich_value").getField(c)).otherwise(df(c)).as(c)
      else df(c)
    } ++ valueFields.filterNot(df.columns.contains).map { c =>
      when(hit, col("__enrich_value").getField(c)).as(c)
    }
    joined.select(merged: _*)
  }
}
