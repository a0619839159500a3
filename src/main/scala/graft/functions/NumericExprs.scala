package graft.functions

import org.apache.spark.sql.{Column, SparkSession, functions}
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** Order-preserving LONG image of a DOUBLE: the IEEE-754 bit pattern
  * with negative payloads flipped (the Lucene sortable-bits transform),
  * so `a < b  ⟺  sortable(a) < sortable(b)` under Spark's double total
  * order — including NaN, which canonicalizes to a pattern ABOVE +Inf,
  * exactly Spark's NaN-sorts-last convention.
  *
  * Why it exists: [[graft.ops.Profile.domainPrefix]] buckets a value
  * domain by high bits of a LONG key. Any fixed numeric quantization
  * (truncate, scale-by-4096, clamp) can be defeated by a domain that
  * concentrates unbounded distinct doubles inside one quantum (epoch
  * micros at 1e18, calibrated probabilities in [0.9998, 1]); the bit
  * pattern cannot — 4096 consecutive patterns contain AT MOST 4096
  * representable doubles, so per-bucket work is type-bounded for every
  * possible input distribution.
  *
  * Why a custom Expression: Spark exposes no double→raw-bits function;
  * a two-line static call with `defineCodeGen` stays inside whole-stage
  * codegen where a UDF would break the pipeline.
  *
  * (Extension surface — the reference engine has no numeric functions;
  * reference: src/logical_plan/logical_expr.rs:137-143.) */
case class SortableF64(child: Expression) extends UnaryExpression
    with ImplicitCastInputTypes {
  override def dataType: DataType = LongType
  override def prettyName: String = "sortable_f64"

  // ImplicitCastInputTypes (not a hard checkInputDataTypes): SQL callers
  // hand this ints, floats and DECIMAL literals — `sortable_f64(0.5)`
  // types as DECIMAL(1,1) under Spark's literal rules — and all of them
  // should coerce to double exactly like the built-in double functions
  // do, instead of a hard TypeCheckFailure (ADVICE r8). (Return type
  // narrowed to Seq[DataType] — AbstractDataType is private[sql].)
  override def inputTypes: Seq[DataType] = Seq(DoubleType)

  override def nullSafeEval(input: Any): Any =
    SortableF64.compute(input.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SortableF64.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SortableF64 =
    copy(child = newChild)
}

object SortableF64 {
  /** Static entry point shared by interpreted eval and generated code. */
  def compute(d: Double): Long = {
    val b = java.lang.Double.doubleToLongBits(d) // canonicalizes NaN
    b ^ ((b >> 63) & 0x7fffffffffffffffL)
  }
}

/** Registration + Column wrappers for the numeric expressions. */
object NumericExprs {
  def register(spark: SparkSession): Unit = {
    val reg = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
    reg.createOrReplaceTempFunction("sortable_f64",
      es => SortableF64(es.head), "built-in")
  }

  /** Requires [[register]] on the active session. */
  def sortableF64(x: Column): Column =
    functions.call_function("sortable_f64", x)
}
