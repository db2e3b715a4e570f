package graft.pipeline

/** Pipeline specification ADT — the typed form of the reference's YAML
  * (`pipelines/observability_correlation_pipeline.yaml:2-44`). The YAML dict
  * IS the reference's logical plan (SURVEY §3 EP1); here it becomes a
  * checked structure the compiler can order and optimize.
  */
final case class PipelineSpec(name: String, stages: Vector[StageSpec])

final case class StageSpec(
    name: String,
    description: String,
    input: InputSpec,
    mappingRead: Option[MappingRead],
    mappingWrite: Option[MappingWrite],
    outputFile: Option[String])

sealed trait InputSpec
/** `type: local_file` (reference `src/data_processor.py:44-48`). */
final case class LocalFileInput(pathTemplate: String) extends InputSpec
/** `type: s3` — bucket/prefix; on Spark this is just an s3a:// URI
  * (replaces the reference's curl workaround, `src/data_processor.py:56-88`).
  */
final case class S3Input(bucket: String, prefixTemplate: String) extends InputSpec

/** Enrich this stage's records from a named mapping
  * (reference `src/data_processor.py:24-28`).
  */
final case class MappingRead(mappingName: String, keyField: String)

/** Extract (key → value) pairs from this stage's records into a named
  * mapping (reference `src/data_processor.py:30-34`). `valueFields` with
  * `single = true` reproduces the single-field wrap + null-skip semantics.
  */
final case class MappingWrite(mappingName: String, keyPath: String, valueFields: Vector[String], single: Boolean)

object PipelineSpec {

  /** Parse the reference YAML shape into a spec. */
  def fromYaml(text: String): PipelineSpec = {
    import Yaml._
    val root = parse(text)
    val stages = root("stages").asInstanceOf[YMap]
    PipelineSpec(
      name = str(root("pipeline_name")),
      stages = stages.entries.map { case (stageName, node) =>
        val m = node.asInstanceOf[YMap]
        val input = m("input").asInstanceOf[YMap]
        val mappings = m.get("redis_mappings").map(_.asInstanceOf[YMap])
        StageSpec(
          name = stageName,
          description = m.get("description").map(str).getOrElse(""),
          input = str(input("type")) match {
            case "local_file" => LocalFileInput(str(input("file_path")))
            case "s3"         => S3Input(str(input("bucket")), str(input("prefix")))
            case other        => throw new IllegalArgumentException(s"unknown input type: $other")
          },
          mappingRead = mappings.flatMap(_.get("read")).map { n =>
            val r = n.asInstanceOf[YMap]
            MappingRead(str(r("redis_key_prefix")), str(r("key_field")))
          },
          mappingWrite = mappings.flatMap(_.get("write")).map { n =>
            val w = n.asInstanceOf[YMap]
            val ff = w("from_fields").asInstanceOf[YMap]
            val (fields, single) = ff("value") match {
              case YList(vs) => (vs, false)
              case YStr(v)   => (Vector(v), true)
              case other     => throw new IllegalArgumentException(s"bad value spec: $other")
            }
            MappingWrite(str(w("redis_key_prefix")), str(ff("key")), fields, single)
          },
          outputFile = m.get("output_file").map(str))
      })
  }
}
