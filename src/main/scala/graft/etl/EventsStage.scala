package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The raw→stage ETL (SURVEY.md §3.2) re-expressed over the harness
  * `events` table: `props` is a JSON string column playing the role of
  * the reference's nested `localizacao` struct.
  *
  * Pipeline = P8 (JSON-path extraction, `historical.py:236-239`) →
  * P1 (applyMapping cast/rename, `stage.py:25-46`) → P2 (unnest,
  * `stage.py:48`) → S8 (partition-column derivation from the nested
  * field, `historical.py:228`).
  *
  * The whole thing is one Project over the scan — map-only, no shuffle;
  * `from_json` runs inside whole-stage codegen. At 100 TB this is an
  * embarrassingly parallel pass whose output would be written
  * `partitionBy(partitionCol)` (SURVEY.md §2.1 S5).
  */
object EventsStage {

  /** Schema of the `props` JSON (FIXTURES.md §B: `{"k": <int>}`). */
  val propsSchema: StructType = StructType(Seq(StructField("k", IntegerType)))

  /** Parse `props` into a struct column (the `localizacao` analog). */
  def parseProps(events: DataFrame): DataFrame =
    events.withColumn("props_struct", from_json(col("props"), propsSchema))

  /** Full stage mapping: parse, extract nested field, cast, rename,
    * derive the partition column, flatten.
    */
  def stage(events: DataFrame): DataFrame = {
    import Mapping._
    val parsed = parseProps(events)
    val mapped = applyMapping(parsed, Seq(
      FieldMapping("event_id", "event_id"),
      FieldMapping("user_id", "user_id"),
      FieldMapping("event_type", "event_type"),
      // string→double cast, mirroring stage.py:40-41's lat/lng casts
      FieldMapping("value", "amount", DoubleType),
      // event time, kept as epoch seconds for oracle-safe output
      FieldMapping("ts", "ts"),
      // nested extraction: props.k → k (cf. localizacao.cidade → cidade)
      FieldMapping("props_struct", "props_struct")
    ))
    val flat = unnest(mapped) // props_struct.k → props_struct_k
    flat
      .withColumnRenamed("props_struct_k", "k")
      // S8: partition column derived from the nested field (estado analog)
      .withColumn("k_bucket", (col("k") % 10).cast(IntegerType))
      .withColumn("ts_epoch", unix_timestamp(col("ts")))
      .drop("ts")
  }
}
