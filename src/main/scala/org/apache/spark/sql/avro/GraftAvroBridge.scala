package org.apache.spark.sql.avro

import org.apache.avro.Schema
import org.apache.spark.sql.types.DataType

/** Minimal access bridge for graft's Avro expressions
  * ([[graft.functions.AvroEncode]]/[[graft.functions.AvroDecode]]):
  * Spark bundles its complete Avro serde kernel in spark-sql but marks
  * it `private[sql]`, so this file — and ONLY this file — lives in the
  * Spark package namespace to re-export the two constructors. No Spark
  * behavior is modified or overridden; this is the standard extension
  * idiom for binding package-private engine internals.
  */
object GraftAvroBridge {
  def serializer(catalystType: DataType, avroType: Schema, nullable: Boolean): AvroSerializer =
    new AvroSerializer(catalystType, avroType, nullable)

  /** CORRECTED rebase (proleptic-Gregorian end-to-end), no positional
    * matching, default union handling, no recursive-schema allowance.
    */
  def deserializer(avroType: Schema, catalystType: DataType): AvroDeserializer =
    new AvroDeserializer(avroType, catalystType, "CORRECTED", false, "", -1)
}
