package graft.engine

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions

/** Logical expression layer mirroring the reference engine's
  * `LogicalExpr` vocabulary (reference: src/logical_plan/logical_expr.rs:10-26,
  * src/physical_plan/expr/binary.rs:87-185) — re-expressed as a small Scala
  * ADT that COMPILES TO Catalyst `Column`s instead of being interpreted.
  *
  * Design: the reference hand-evaluates each expression against Arrow
  * batches; here `compile` emits a Catalyst expression tree, so Spark's
  * analyzer resolves names, the optimizer folds constants / pushes
  * predicates into the scan, and Tungsten whole-stage-codegen evaluates it.
  * Nothing in this file executes per-row Scala code.
  *
  * The full reference surface is covered:
  *  - Column / Literal / Alias            (logical_expr.rs:15-19, 124-127)
  *  - 13 binary ops: Eq Neq Gt GtEq Lt LtEq And Or Add Sub Mul Div Mod
  *    (logical_expr.rs:94-121)
  *  - scalar fns CONCAT SUBSTRING ABS SQRT POWER (logical_expr.rs:137-143 —
  *    declared-only in the reference; implemented here via Spark built-ins)
  *  - aggregate fns SUM MIN MAX AVG COUNT  (src/physical_plan/aggr/)
  */
sealed trait Expr {
  /** Compile to a Catalyst column. */
  def toColumn: Column

  /** Reference-style display name, used for plan pretty-printing parity
    * (reference: logical_expr.rs:59-91 `to_field` name generation). */
  def name: String

  // ---- fluent DSL (mirrors data_frame/logical_expr builder surface) ----
  def ===(other: Expr): Expr = BinaryExpr(this, Op.Eq, other)
  def =!=(other: Expr): Expr = BinaryExpr(this, Op.Neq, other)
  def >(other: Expr): Expr = BinaryExpr(this, Op.Gt, other)
  def >=(other: Expr): Expr = BinaryExpr(this, Op.GtEq, other)
  def <(other: Expr): Expr = BinaryExpr(this, Op.Lt, other)
  def <=(other: Expr): Expr = BinaryExpr(this, Op.LtEq, other)
  def &&(other: Expr): Expr = BinaryExpr(this, Op.And, other)
  def ||(other: Expr): Expr = BinaryExpr(this, Op.Or, other)
  def +(other: Expr): Expr = BinaryExpr(this, Op.Add, other)
  def -(other: Expr): Expr = BinaryExpr(this, Op.Sub, other)
  def *(other: Expr): Expr = BinaryExpr(this, Op.Mul, other)
  def /(other: Expr): Expr = BinaryExpr(this, Op.Div, other)
  def %(other: Expr): Expr = BinaryExpr(this, Op.Mod, other)
  def as(alias: String): Expr = Alias(this, alias)
  /** Null-safe equality (SQL IS NOT DISTINCT FROM): NULL <=> NULL is
    * TRUE, NULL <=> x is FALSE — never NULL. The join-key form SQL
    * engines use when key columns are nullable (extension beyond the
    * reference's 13 binary ops, which are all null-propagating). */
  def <=>(other: Expr): Expr = Raw(this.toColumn <=> other.toColumn,
    s"${this.name} <=> ${other.name}")
  // unary completions (extension beyond the reference's 13 binary ops)
  def unary_! : Expr = Raw(!this.toColumn, s"NOT ${this.name}")
  def unary_- : Expr = Raw(-this.toColumn, s"-${this.name}")
  def isNull: Expr = Raw(this.toColumn.isNull, s"${this.name} IS NULL")
  def isNotNull: Expr = Raw(this.toColumn.isNotNull, s"${this.name} IS NOT NULL")
}

/** Binary operator enum — exactly the reference's 13 (logical_expr.rs:94-121). */
object Op extends Enumeration {
  val Eq, Neq, Gt, GtEq, Lt, LtEq, And, Or, Add, Sub, Mul, Div, Mod = Value
  /** Reference operator spellings (logical_expr.rs:96-120 Display impl). */
  def symbol(op: Value): String = op match {
    case Eq => "="; case Neq => "!="; case Gt => ">"; case GtEq => ">="
    case Lt => "<"; case LtEq => "<="; case And => "AND"; case Or => "OR"
    case Add => "+"; case Sub => "-"; case Mul => "*"; case Div => "/"
    case Mod => "%"
  }
}

/** By-name column reference (reference: expr/column.rs:10-33). Resolution
  * is delegated to Catalyst's analyzer instead of positional binding. */
final case class ColumnRef(colName: String) extends Expr {
  def toColumn: Column = functions.col(colName)
  def name: String = colName
}

/** Literal scalar (reference: expr/literal.rs:10-38 + datatype/scalar.rs:13-26).
  * Catalyst `Literal` broadcasts lazily exactly like the reference's
  * `ColumnArray::Scalar` (column_array.rs:11-29). */
final case class Lit(value: Any) extends Expr {
  def toColumn: Column = functions.lit(value)
  def name: String = value match {
    case s: String => s; case null => "NULL"; case v => v.toString
  }
}

/** Output-field rename (reference: expr/alias.rs:9-34). */
final case class Alias(child: Expr, alias: String) extends Expr {
  def toColumn: Column = child.toColumn.as(alias)
  def name: String = alias
}

/** The 13 binary ops (reference: expr/binary.rs:87-185). The reference
  * requires identical operand types (binary.rs:111-116); Spark's implicit
  * type coercion is a strict superset — deliberate semantic upgrade. */
final case class BinaryExpr(left: Expr, op: Op.Value, right: Expr) extends Expr {
  def toColumn: Column = {
    val (l, r) = (left.toColumn, right.toColumn)
    op match {
      case Op.Eq => l === r;  case Op.Neq => l =!= r
      case Op.Gt => l > r;    case Op.GtEq => l >= r
      case Op.Lt => l < r;    case Op.LtEq => l <= r
      case Op.And => l && r;  case Op.Or => l || r
      case Op.Add => l + r;   case Op.Sub => l - r
      case Op.Mul => l * r;   case Op.Div => l / r
      case Op.Mod => l % r
    }
  }
  def name: String = s"${left.name} ${Op.symbol(op)} ${right.name}"
}

/** Scalar function call. The reference declares CONCAT SUBSTRING ABS SQRT
  * POWER but never implements them (planner/mod.rs:164 `unimplemented!()`);
  * here each maps to the codegen'd Spark built-in. */
final case class ScalarFn(fn: String, args: Seq[Expr]) extends Expr {
  // Locale.ROOT: a tr_TR default locale would uppercase "min" to "MİN"
  private def fnU: String = fn.toUpperCase(java.util.Locale.ROOT)
  def toColumn: Column = {
    val c = args.map(_.toColumn)
    fnU match {
      case "CONCAT"    => functions.concat(c: _*)
      case "SUBSTRING" => c.head.substr(c(1), c(2))
      case "ABS"       => functions.abs(c.head)
      case "SQRT"      => functions.sqrt(c.head)
      case "POWER"     => functions.pow(c(0), c(1))
      case other => throw new IllegalArgumentException(
        s"unknown scalar function: $other")
    }
  }
  def name: String = s"$fnU(${args.map(_.name).mkString(", ")})"
}

/** Aggregate function call (reference: physical_plan/aggr/{sum,min,max,avg,
  * count}.rs). Unlike the reference — whose planner only supports aggregating
  * a bare column (planner/mod.rs:59-63 downcast) — any expression may be
  * aggregated. Output name follows the reference's "FN(operand)" convention
  * (logical_expr.rs:176-191) unless aliased. */
final case class AggFn(fn: String, child: Expr) extends Expr {
  private def fnU: String = fn.toUpperCase(java.util.Locale.ROOT)
  def toColumn: Column = {
    val c = child.toColumn
    fnU match {
      case "SUM" => functions.sum(c)
      case "MIN" => functions.min(c)
      case "MAX" => functions.max(c)
      case "AVG" => functions.avg(c)
      case "COUNT" => functions.count(c)
      case other => throw new IllegalArgumentException(
        s"unknown aggregate function: $other")
    }
  }
  def name: String = s"$fnU(${child.name})"
}

/** Escape hatch: wrap any Spark Column in the Expr ADT, so engine users can
  * mix reference-style exprs with the full Spark function library. */
final case class Raw(column: Column, name: String) extends Expr {
  def toColumn: Column = column
}

/** Constructor DSL mirroring the reference's free functions
  * (logical_expr.rs: `col`, `lit`, `alias`, `sum`, ...). */
object Exprs {
  def col(name: String): Expr = ColumnRef(name)
  def lit(v: Any): Expr = Lit(v)
  def concat(args: Expr*): Expr = ScalarFn("CONCAT", args)
  def substring(e: Expr, pos: Expr, len: Expr): Expr =
    ScalarFn("SUBSTRING", Seq(e, pos, len))
  def abs(e: Expr): Expr = ScalarFn("ABS", Seq(e))
  def sqrt(e: Expr): Expr = ScalarFn("SQRT", Seq(e))
  def power(base: Expr, exp: Expr): Expr = ScalarFn("POWER", Seq(base, exp))
  def sum(e: Expr): Expr = AggFn("SUM", e)
  def min(e: Expr): Expr = AggFn("MIN", e)
  def max(e: Expr): Expr = AggFn("MAX", e)
  def avg(e: Expr): Expr = AggFn("AVG", e)
  def count(e: Expr): Expr = AggFn("COUNT", e)
}
