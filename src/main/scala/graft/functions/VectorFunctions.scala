package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `ArrayType` embedding columns, built entirely from
  * Catalyst higher-order functions (`zip_with`, `aggregate`, `transform`).
  *
  * No UDFs: every expression here stays visible to the optimizer and runs
  * inside whole-stage codegen, so a brute-force similarity scan is a single
  * codegen'd pipeline over the vector column — the right baseline before
  * LSH/IVF pre-bucketing at large scale (see graft.operators.LlmOps).
  */
object VectorFunctions {

  /** Cast a float vector to double element-wise (exact widening) so that
    * downstream arithmetic is double-precision end to end — required for
    * bit-identical parity with a double-computing oracle. */
  def toDoubleVec(c: Column): Column = transform(c, _.cast("double"))

  /** Dot product via zip_with + left-fold aggregate; sequential fold order
    * makes the floating-point result deterministic for a given row. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, _ * _), lit(0.0), _ + _)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity dot(a,b) / (|a|·|b|). */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Squared euclidean distance — the IVF centroid-routing metric (one
    * definition, shared by serving and append assignment in
    * graft.operators.Ann so the two can never diverge). */
  def sqDist(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0), _ + _)
}
