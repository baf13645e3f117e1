package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns, built from
  * codegen'd higher-order functions (no UDFs — stays inside
  * whole-stage codegen, SURVEY.md §2.11 / §4.4).
  *
  * All arithmetic is double-accumulated LEFT-TO-RIGHT (`aggregate` is
  * a sequential fold) so results are bit-deterministic and
  * reproducible in the DuckDB oracle via `list_reduce`.
  */
object VectorFunctions {

  /** Σ aᵢ·bᵢ, products and accumulation in double. */
  def dotD(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, x) => acc + x
    )

  /** ‖a‖₂ with double accumulation. */
  def normD(a: Column): Column = sqrt(dotD(a, a))

  /** cos(a,b) = a·b / (‖a‖·‖b‖). */
  def cosineD(a: Column, b: Column): Column =
    dotD(a, b) / (normD(a) * normD(b))
}
