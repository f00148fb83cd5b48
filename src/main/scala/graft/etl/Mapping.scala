package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Batch projection operators — the Spark-native rebuild of the
  * reference's Glue DynamicFrame transforms (SURVEY.md §2.2):
  *
  *  - [[applyMapping]] ⇔ `ApplyMapping.apply` (`glue_scripts/stage.py:25-46`):
  *    project + rename + cast, including nested-field extraction
  *    (`localizacao.cidade → cidade`) and string→double casts
  *    (`stage.py:40-41`).
  *  - [[unnest]] ⇔ `DynamicFrame.unnest()` (`glue_scripts/stage.py:48`):
  *    recursively flattens struct columns into top-level columns.
  *  - [[dropFields]] ⇔ `DropFields.apply` (`glue_scripts/spec.py:40-44`):
  *    PII removal.
  *
  * All three are pure `select`/`drop` plans: Catalyst collapses them into
  * a single Project over the scan, so column pruning reaches the parquet
  * footer (check `.explain`: ReadSchema only carries the mapped source
  * columns). Map-only — no shuffle at any scale.
  */
object Mapping {

  /** One field mapping: source column (may be a nested path like
    * `localizacao.cidade`), target name, optional target type.
    */
  final case class FieldMapping(src: String, dst: String, castTo: Option[DataType] = None)

  object FieldMapping {
    def apply(src: String, dst: String, t: DataType): FieldMapping =
      FieldMapping(src, dst, Some(t))
  }

  /** Project + rename + cast in one Project node (cf. `stage.py:25-46`). */
  def applyMapping(df: DataFrame, mappings: Seq[FieldMapping]): DataFrame = {
    val cols: Seq[Column] = mappings.map { m =>
      val base = col(m.src)
      m.castTo.fold(base)(base.cast).alias(m.dst)
    }
    df.select(cols: _*)
  }

  /** Recursively flatten all struct columns; nested names join with `_`
    * (Glue's unnest uses `.`-joined names, which are awkward as Spark
    * identifiers — `_` keeps the same information loss-free).
    */
  def unnest(df: DataFrame, sep: String = "_"): DataFrame = {
    def expand(schema: StructType, prefix: Seq[String]): Seq[Column] =
      schema.fields.flatMap { f =>
        val path = prefix :+ f.name
        f.dataType match {
          case s: StructType => expand(s, path)
          case _ =>
            Seq(col(path.map(quote).mkString(".")).alias(path.mkString(sep)))
        }
      }
    if (df.schema.fields.exists(_.dataType.isInstanceOf[StructType]))
      df.select(expand(df.schema, Nil): _*)
    else df
  }

  private def quote(name: String): String = s"`${name.replace("`", "``")}`"

  /** Drop columns (PII removal, cf. `spec.py:42`). Unknown names are
    * ignored, matching Glue's DropFields behavior.
    */
  def dropFields(df: DataFrame, fields: String*): DataFrame =
    df.drop(fields: _*)
}
