package graft.functions

import org.apache.spark.sql.{Column, SparkSession, functions}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expressions for embedding math over `array<float>`
  * columns (the `embeddings.embedding` column, FIXTURES.md §2).
  *
  * Why a custom Expression and not `zip_with`/`aggregate` higher-order
  * functions or a Scala UDF: higher-order functions run a per-element
  * lambda interpreter (the loop never enters whole-stage codegen) and a
  * UDF adds (de)serialization; a fused primitive loop with `doGenCode`
  * stays inside Tungsten codegen. This is the hot inner loop of every
  * similarity-search / near-dup query — executed O(candidates × dim).
  * Accumulation is in Double regardless of the Float input for precision.
  *
  * (The reference engine has no vector ops at all — this is extension
  * surface mandated by the 100 TB training-data-pipeline north star.)
  */
abstract class FloatVecBinary extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<float> arguments, got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
  }

  protected def compute(a: ArrayData, b: ArrayData): Any

  override def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
}

/** dot(a, b) — inner product in double precision. Mismatched lengths
  * yield NULL (a silent prefix-dot would corrupt every downstream
  * ANN/LSH score without any error surfacing). */
case class DotProduct(left: Expression, right: Expression) extends FloatVecBinary {
  override def prettyName: String = "dot_f"
  override protected def compute(a: ArrayData, b: ArrayData): Any = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var s = 0.0; var i = 0
    while (i < n) { s += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    s
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i"); val s = ctx.freshName("s")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $s += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |  }
         |  ${ev.value} = $s;
         |}
       """.stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** cosine(a, b) = dot / (|a|·|b|); 0.0 when either norm is 0; NULL on
  * mismatched lengths (see [[DotProduct]]). One fused pass computes the
  * dot product and both norms. */
case class CosineSimilarity(left: Expression, right: Expression) extends FloatVecBinary {
  override def prettyName: String = "cosine_sim"
  override protected def compute(a: ArrayData, b: ArrayData): Any = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble; val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y; i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) 0.0 else dot / denom
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na")
      val nb = ctx.freshName("nb"); val x = ctx.freshName("x")
      val y = ctx.freshName("y"); val den = ctx.freshName("den")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $x = (double) $a.getFloat($i);
         |    double $y = (double) $b.getFloat($i);
         |    $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |  }
         |  double $den = java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb);
         |  ${ev.value} = ($den == 0.0) ? 0.0 : $dot / $den;
         |}
       """.stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** Registration + Column-level wrappers. Registration is per-session and
  * idempotent; wrappers use `call_function`, so they resolve against the
  * active session's registry at analysis time. Requires a CLASSIC
  * SparkSession (the cast below throws on a Spark Connect session) —
  * Connect deployments should configure
  * `spark.sql.extensions=graft.GraftExtensions` on the server instead. */
object VectorExprs {
  def register(spark: SparkSession): Unit = {
    val reg = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
    reg.createOrReplaceTempFunction("dot_f",
      es => DotProduct(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction("cosine_sim",
      es => CosineSimilarity(es(0), es(1)), "built-in")
  }

  /** Requires [[register]] to have been called on the active session. */
  def dot(a: Column, b: Column): Column = functions.call_function("dot_f", a, b)
  def cosineSim(a: Column, b: Column): Column =
    functions.call_function("cosine_sim", a, b)
}
