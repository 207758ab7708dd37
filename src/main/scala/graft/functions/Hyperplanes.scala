package graft.functions

/** The engine's ONE family of deterministic ±1 random hyperplanes
  * (Charikar, STOC 2002 sign-LSH), shared by every consumer so that
  * signatures computed anywhere — the q124/q314 index builders in
  * [[graft.operators.NearDup]], their DuckDB oracle mirror, and the
  * [[graft.plans.SimilarityBandRewrite]] optimizer rule — are
  * bit-identical. Plane signs come from a Knuth multiplicative hash of
  * (plane, dimension), so any engine (and the SQL oracle) regenerates
  * them with integer arithmetic alone: no RNG state, no seed file.
  */
object Hyperplanes {
  /** Signature width in bits. 32 planes banded 8×4 (VERDICT r10 item 2):
    * measured recall ≥ 0.9 with the flip-1 multi-probe ring (q291). */
  val NPlanes = 32

  /** Band count over the signature: 8 bands × 4 bits. */
  val NBands = 8

  /** Embedding dimensionality the plane family is generated for. */
  val Dims = 64

  /** ±1 sign of plane `p` at 1-based dimension `j1` — the Knuth-hash
    * recipe the SQL oracle mirrors (NearDup.hyperplaneCtesSql). */
  def planeSign(p: Int, j1: Int): Double =
    if ((((p * 64L + j1) * 2654435761L) % 1000003L) % 2L == 0L) 1.0 else -1.0

  /** Plane `p` as the float array literal the codegen'd dot consumes. */
  def planeArray(p: Int): Array[Float] =
    Array.tabulate(Dims)(j0 => planeSign(p, j0 + 1).toFloat)
}
