package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** Z-order (Morton) interleaving — the DATA LAYOUT tool for
  * multi-dimensional skipping at 100 TB: writing files clustered by
  * the interleaved bits of two (or more) filter columns makes each
  * file's min/max footprint in BOTH dimensions tight, so a box
  * predicate prunes most files at planning time. Single-column sort
  * gives perfect skipping on one dimension and none on the other;
  * key-hash layout gives none on either (every file spans the full
  * value range). This is what Delta/Iceberg `OPTIMIZE ZORDER BY`
  * does; here it is a first-class expression so an engine user can
  * `repartitionByRange(zvalue)` before a write and AUDIT the
  * achieved skipping (q189 measures exactly that, against the
  * hash-layout strawman, with integer-exact math both engines can
  * reproduce).
  *
  * [[ZValue]] interleaves the low `bits` bits of two non-negative
  * ints: x on even positions, y on odd — `z = Σᵢ x_bit(i)·4^i +
  * 2·y_bit(i)·4^i`. Pure integer kernel with real `doGenCode`
  * (shift/mask loop, no allocation); the DuckDB oracle unrolls the
  * identical sum with `>>`/`&`/`*` arithmetic.
  */
object ZOrder {

  /** Morton z-value of two int columns' low `bits` bits (bits ≤ 31;
    * result fits a long). Inputs are masked to `bits` — callers bound
    * their dimensions first (q189 uses `pmod(col, 256)` for 8-bit
    * coordinates). */
  def zvalue(x: Column, y: Column, bits: Int = 8): Column =
    org.apache.spark.sql.GraftSqlShim.column(ZValue(
      org.apache.spark.sql.GraftSqlShim.expression(x),
      org.apache.spark.sql.GraftSqlShim.expression(y), bits))

  /** Kernel (called from generated code). */
  def zEval(x: Int, y: Int, bits: Int): Long = {
    var z = 0L
    var i = 0
    while (i < bits) {
      z |= ((x >> i) & 1).toLong << (2 * i)
      z |= ((y >> i) & 1).toLong << (2 * i + 1)
      i += 1
    }
    z
  }
}

/** Native Morton-interleave expression — see [[ZOrder.zvalue]]. */
case class ZValue(left: Expression, right: Expression, bits: Int)
  extends BinaryExpression {

  require(bits >= 1 && bits <= 31, s"zvalue bits must be in [1,31], got $bits")

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (IntegerType, IntegerType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_zvalue expects (int, int), got ($l, $r)")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_zvalue"

  override def nullSafeEval(x: Any, y: Any): Any =
    ZOrder.zEval(x.asInstanceOf[Int], y.asInstanceOf[Int], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) =>
      s"${ev.value} = graft.ops.ZOrder.zEval($x, $y, $bits);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
