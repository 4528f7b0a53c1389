package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType}

/** Wire-format (de)serialization with the reference's error semantics.
  *
  * The reference derives a circe-JSON serde per type (KSA = reference
  * `src/main/scala/KafkaStreamsApp.scala:59-74`): serialize =
  * `a.asJson.noSpaces` (KSA:61), deserialize = parse-and-decode where a
  * decode failure yields `None` and the malformed record is DROPPED with a
  * log line (KSA:64-70). Spark mapping: `from_json` (PERMISSIVE) returns a
  * null struct for undecodable input, and the null-filter below IS the
  * drop; `to_json(struct(...))` is the serializer.
  */
object Serde {

  /** Deserialize a JSON string column against `schema`, DROPPING rows whose
    * payload cannot be decoded at all (KSA:64-70 semantics). Fields that
    * parse partially keep their parseable values (PERMISSIVE), matching a
    * lenient decoder; pass a non-nullable check downstream for strictness.
    *
    * @param keep passthrough columns (e.g. the record key / timestamp)
    */
  def fromJsonDropMalformed(jsonCol: Column, schema: StructType, keep: Seq[Column])(
      df: DataFrame): DataFrame = {
    // PERMISSIVE from_json yields an all-null struct (not a null struct)
    // for undecodable input, so "parsed is null" cannot express the drop;
    // the corrupt-record column is the engine's drop-malformed signal.
    val corrupt = "__corrupt"
    val parseSchema = schema.add(corrupt, StringType)
    df.withColumn("__parsed",
        from_json(jsonCol, parseSchema, Map("columnNameOfCorruptRecord" -> corrupt)))
      .filter(col(s"__parsed.$corrupt").isNull)
      .select(keep ++ schema.fieldNames.toSeq.map(f => col(s"__parsed.$f")): _*)
  }

  /** Serialize columns to a single JSON string column (KSA:61 analog):
    * the value payload for a Kafka-style sink.
    */
  def toJsonValue(cols: Column*): Column = to_json(struct(cols: _*))
}
