package graft.functions

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericDatumReader, GenericDatumWriter}
import org.apache.avro.io.{BinaryDecoder, BinaryEncoder, DecoderFactory, EncoderFactory}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodeGenerator, CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{BinaryType, DataType}

/** `to_avro`/`from_avro` as graft-native expressions. Spark 4.1 ships
  * the complete Avro kernel INSIDE spark-sql (`AvroSerializer`,
  * `AvroDeserializer`, `SchemaConverters` — the same classes its file
  * source uses), but gates the BUILT-IN from_avro/to_avro SQL
  * functions on the external `spark-avro` module being present
  * (`AVRO_NOT_LOADED_SQL_FUNCTIONS_UNUSABLE` otherwise), which a
  * zero-egress deployment cannot fetch. These expressions bind the
  * bundled kernel directly. Wire format matches spark-avro's
  * functions: ONE raw binary-encoded datum per value, no container
  * framing — interoperable with any standard Avro consumer that knows
  * the writer schema.
  *
  * The schema is a plan-time STRING constant (like the reference's
  * serde config, not per-row data), so each task builds its
  * serializer/reader once and reuses the encoder/decoder buffers
  * across rows — the same amortization the Avro API is designed for.
  */
case class AvroEncode(child: Expression, jsonSchema: String) extends UnaryExpression {
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    try {
      serializer // forces schema parse + catalyst-vs-avro structural check
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    } catch { case e: Exception =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"avro_encode: input type ${child.dataType.sql} does not match the writer schema: ${e.getMessage}")
    }

  @transient private lazy val avroType: Schema = new Schema.Parser().parse(jsonSchema)
  @transient private lazy val serializer =
    org.apache.spark.sql.avro.GraftAvroBridge.serializer(child.dataType, avroType, child.nullable)
  @transient private lazy val writer = new GenericDatumWriter[Any](avroType)
  @transient private lazy val out = new java.io.ByteArrayOutputStream()
  @transient private var encoder: BinaryEncoder = _

  override def nullSafeEval(input: Any): Any = {
    out.reset()
    encoder = EncoderFactory.get().directBinaryEncoder(out, encoder)
    writer.write(serializer.serialize(input), encoder)
    encoder.flush()
    out.toByteArray
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("avroEncode", this)
    defineCodeGen(ctx, ev, input => s"(byte[]) $ref.nullSafeEval($input)")
  }

  override protected def withNewChildInternal(newChild: Expression): AvroEncode =
    copy(child = newChild)
  override def prettyName: String = "avro_encode"
}

/** Binary Avro datum → Catalyst value under the schema's SQL type
  * (see [[AvroEncode]]). Strict by design: a corrupt or
  * schema-incompatible record THROWS instead of null-filling — Avro's
  * typed contract, vs `from_json`'s schema-on-read laxity. NULL input
  * stays NULL.
  */
case class AvroDecode(child: Expression, jsonSchema: String) extends UnaryExpression {
  @transient private lazy val avroType: Schema = new Schema.Parser().parse(jsonSchema)
  override lazy val dataType: DataType =
    org.apache.spark.sql.avro.SchemaConverters.toSqlType(avroType).dataType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case BinaryType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"avro_decode requires a binary input, got ${other.sql}")
    }

  // CORRECTED rebase: proleptic-Gregorian timestamps end-to-end (the
  // engine never writes legacy-hybrid Avro); no positional matching,
  // no pushed filters, unbounded-recursion schemas rejected by Avro
  @transient private lazy val deserializer =
    org.apache.spark.sql.avro.GraftAvroBridge.deserializer(avroType, dataType)
  @transient private lazy val reader = new GenericDatumReader[Any](avroType)
  @transient private var decoder: BinaryDecoder = _
  @transient private var datum: Any = _

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    decoder = DecoderFactory.get().binaryDecoder(bytes, 0, bytes.length, decoder)
    datum = reader.read(datum, decoder)
    deserializer.deserialize(datum).getOrElse(null)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("avroDecode", this)
    // deserialize may legitimately produce null — guard it into isNull
    // instead of handing codegen a null struct value
    nullSafeCodeGen(ctx, ev, input => {
      val result = ctx.freshName("avroResult")
      val dt = CodeGenerator.boxedType(dataType)
      s"""
        $dt $result = ($dt) $ref.nullSafeEval($input);
        if ($result == null) { ${ev.isNull} = true; } else { ${ev.value} = $result; }
      """
    })
  }

  override protected def withNewChildInternal(newChild: Expression): AvroDecode =
    copy(child = newChild)
  override def prettyName: String = "avro_decode"
}
