package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Cosine similarity between two `array<double>` columns as a native
  * Catalyst expression with full codegen: one fused loop computing dot
  * product and both norms — no intermediate arrays, no boxing, no
  * higher-order-function interpretation overhead. This is the hot-path
  * primitive for the similarity-search and embedding-dedup operators;
  * at 100 TB it runs inside whole-stage codegen next to the scan.
  *
  * Accumulation is strictly sequential (index 0..n-1) and the final
  * value is `dot / sqrt(na) / sqrt(nb)` — the same IEEE operation order
  * as the generated DuckDB oracle SQL, so results compare bit-exactly.
  *
  * Mismatched vector lengths throw (silent truncation would mask bad
  * ingest rows AND diverge from the oracle, which normalizes each side
  * over its own full length). A NULL element on either side yields
  * NULL — the same propagation as the oracle's list arithmetic and the
  * sibling array expressions (HyperplaneSigs/PqEncode); reading the
  * slot as 0.0 would produce a structurally-valid but wrong score. A
  * zero vector yields NaN (0/0), which threshold filters drop —
  * callers wanting explicit null handling should pre-filter zero
  * norms.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.types.{ArrayType, DoubleType => DT}
    (left.dataType, right.dataType) match {
      case (ArrayType(DT, _), ArrayType(DT, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires two array<double> inputs, got $l and $r")
    }
  }

  /** The per-element null check costs a branch in the innermost loop —
    * measurable on the ANN hot path (q79 regressed ~2.2× when it was
    * added unconditionally in round 8). The schema already knows whether
    * elements CAN be null: when both inputs declare
    * `ArrayType(..., containsNull = false)` the branch is provably dead,
    * so both the interpreted and generated loops omit it and keep the
    * round-7 branch-free fused form. The null contract itself is
    * unchanged — nullable-element inputs still take the checking loop.
    * Shared gate: [[NullGates.anyNullableElements]].
    */
  @transient private lazy val elementsNullable: Boolean =
    NullGates.anyNullableElements(left.dataType, right.dataType)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = CosineSimilarity.checkedLength(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    if (elementsNullable) {
      while (i < n) {
        if (x.isNullAt(i) || y.isNullAt(i)) return null
        val xi = x.getDouble(i); val yi = y.getDouble(i)
        dot += xi * yi; na += xi * xi; nb += yi * yi
        i += 1
      }
    } else {
      while (i < n) {
        val xi = x.getDouble(i); val yi = y.getDouble(i)
        dot += xi * yi; na += xi * xi; nb += yi * yi
        i += 1
      }
    }
    dot / math.sqrt(na) / math.sqrt(nb)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      val anyNull = ctx.freshName("anyNull")
      if (elementsNullable) s"""
        int $n = graft.functions.CosineSimilarity.checkedLength($a.numElements(), $b.numElements());
        double $dot = 0.0, $na = 0.0, $nb = 0.0;
        boolean $anyNull = false;
        for (int $i = 0; $i < $n; $i++) {
          if ($a.isNullAt($i) || $b.isNullAt($i)) { $anyNull = true; break; }
          double $xi = $a.getDouble($i);
          double $yi = $b.getDouble($i);
          $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
        }
        if ($anyNull) {
          ${ev.isNull} = true;
        } else {
          ${ev.value} = $dot / java.lang.Math.sqrt($na) / java.lang.Math.sqrt($nb);
        }
      """ else s"""
        int $n = graft.functions.CosineSimilarity.checkedLength($a.numElements(), $b.numElements());
        double $dot = 0.0, $na = 0.0, $nb = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          double $xi = $a.getDouble($i);
          double $yi = $b.getDouble($i);
          $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
        }
        ${ev.value} = $dot / java.lang.Math.sqrt($na) / java.lang.Math.sqrt($nb);
      """
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSimilarity =
    copy(left = l, right = r)
  override def prettyName: String = "cosine_sim"
}

/** The one shared schema-dead-null-branch gate for the vector kernels
  * ([[CosineSimilarity]], `HyperplaneSigs`, `PqEncode`): true when any
  * input COULD hold null elements per its declared type — the kernels
  * run their per-element null-checking loop exactly then, and the
  * branch-free fused loop when the schema (usually narrowed by
  * [[KnownNonNullElements]] at the load boundary) proves the branch
  * dead. One definition so the contract can't drift between kernels.
  */
private[functions] object NullGates {
  import org.apache.spark.sql.types.ArrayType
  def anyNullableElements(dts: DataType*): Boolean = dts.exists {
    case ArrayType(_, cn) => cn
    case _ => true
  }
}

object CosineSimilarity {
  /** Fails loudly on mismatched vector lengths (bad ingest rows). */
  def checkedLength(a: Int, b: Int): Int = {
    if (a != b) throw new IllegalArgumentException(
      s"cosine_sim: vector lengths differ ($a vs $b)")
    a
  }
}

/** Zero-cost nullability narrowing for an array column — the array
  * analog of Spark's own `KnownNotNull`: the value passes through
  * untouched (identity in both eval and codegen), only the declared
  * `ArrayType.containsNull` flips to false. Applied at the embeddings
  * LOAD boundary to state the ingest contract "vectors have no null
  * elements": parquet infers nullable list elements, which would
  * otherwise force every downstream vector kernel
  * ([[CosineSimilarity]]/[[HyperplaneSigs]]/[[PqEncode]]) into its
  * per-element null-checking loop on data that provably has none
  * (q79 paid ~2.2× for that branch in round 8).
  *
  * Like any schema assertion (`spark.read.schema` with a required
  * field), this is trusted, not verified: a row that violates the
  * contract yields undefined values downstream. Declare it only at
  * boundaries whose writer guarantees dense vectors.
  */
case class KnownNonNullElements(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  import org.apache.spark.sql.types.ArrayType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case _: ArrayType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires an array input, got $other")
    }

  override def dataType: DataType = child.dataType match {
    case ArrayType(et, _) => ArrayType(et, containsNull = false)
    case other => other
  }
  override def nullable: Boolean = child.nullable
  // identity on the value → null out iff null in; declaring it lets
  // InferFiltersFromConstraints rewrite isnotnull(known_non_null_elements(x))
  // to isnotnull(x), which is what pushes the null filter to the scan
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any = input
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => c)

  override protected def withNewChildInternal(newChild: Expression): KnownNonNullElements =
    copy(child = newChild)
  override def prettyName: String = "known_non_null_elements"
}
