package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns.
  *
  * All arithmetic is double products accumulated LEFT-TO-RIGHT, so
  * results are bit-deterministic and reproducible in the DuckDB
  * oracle via `list_reduce` — whichever execution path computes them.
  *
  * [[dotD]] plans the custom codegen [[DotProductExpr]] (a tight
  * primitive loop inside whole-stage codegen); [[dotHof]] is the
  * built-in higher-order-function formulation with identical
  * semantics, kept as the pure-built-in reference implementation
  * (and to cross-check the custom expression in tests).
  */
object VectorFunctions {

  /** Σ aᵢ·bᵢ, products and accumulation in double (codegen path). */
  def dotD(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      DotProductExpr(
        org.apache.spark.sql.GraftColumnBridge.expression(a),
        org.apache.spark.sql.GraftColumnBridge.expression(b)))

  /** Same semantics via built-in higher-order functions. */
  def dotHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, x) => acc + x
    )

  /** ‖a‖₂ with double accumulation. */
  def normD(a: Column): Column = sqrt(dotD(a, a))

  /** Random-hyperplane sign signature as a BIGINT (bit i ⇔
    * planes(i)·a ≥ 0); fused codegen loop, see [[SignBandsExpr]]. */
  def signBands(a: Column, planes: Array[Array[Double]]): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      SignBandsExpr(
        org.apache.spark.sql.GraftColumnBridge.expression(a), planes))

  /** cos(a,b) = a·b / (‖a‖·‖b‖). */
  def cosineD(a: Column, b: Column): Column =
    dotD(a, b) / (normD(a) * normD(b))
}
