package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `ArrayType` embedding columns.
  *
  * No UDFs anywhere — but note the round-14 correction to this file's
  * original claim: Catalyst higher-order functions do NOT run inside
  * whole-stage codegen (they evaluate interpreted, and expressions
  * referenced in their lambdas re-evaluate per element). The HOT paths
  * therefore use native fused expressions ([[CosineSimilarityExpr]],
  * [[SqDistExpr]], `PqEncodeExpr`/`PqAdcExpr`), each spec-pinned
  * bit-identical to the HOF formulation it replaced; the HOF forms stay
  * as independent cross-validation witnesses and for the cold paths
  * where composability beats raw speed.
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
    * graft.operators.Ann so the two can never diverge). Since round 14
    * this is the native fused [[SqDistExpr]] — bit-identical to the HOF
    * form below (same left-to-right accumulation, same null contract),
    * which stays as the spec-pinned cross-validation witness. */
  def sqDist(a: Column, b: Column): Column = SqDistExpr.sq_dist(a, b)

  /** HOF twin of [[sqDist]], cross-validation only (never a data path):
    * interpreted, and per-element when referenced inside a lambda. */
  private[graft] def sqDistHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0), _ + _)
}
