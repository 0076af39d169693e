package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns, as codegen'd
  * higher-order functions (zip_with/aggregate) — no UDFs, so the dot
  * product stays inside whole-stage codegen.
  *
  * All arithmetic is double: float32 inputs are upcast first so results
  * are bit-reproducible against the DuckDB oracle (which casts to
  * DOUBLE[] and folds left-to-right, same as `aggregate`).
  */
object VectorFunctions {

  def toDoubleVec(v: Column): Column = transform(v, _.cast("double"))

  /** Sequential left-fold dot product in double. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  /** cosine(a,b) = dot / (||a|| * ||b||), evaluated in exactly this
    * association so the oracle can reproduce it bit-for-bit. */
  def cosine(a: Column, b: Column): Column = {
    val ad = toDoubleVec(a)
    val bd = toDoubleVec(b)
    dot(ad, bd) / (l2Norm(ad) * l2Norm(bd))
  }
}
