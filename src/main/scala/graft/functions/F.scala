package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{call_function, lit}

/** Typed Column facade over graft's native Catalyst expressions.
  *
  * Uses the public `call_function` API against the SQL names
  * registered by [[GraftFunctions]]; graft.Tables.load installs them
  * into any session it touches (and `spark.sql.extensions=
  * graft.GraftExtensions` covers externally-built sessions), so these
  * helpers are safe anywhere fixture data is in play.
  */
object F {
  /** DuckDB/C-convention binary-value rounding (see [[RoundBin]]).
    * Use this — not functions.round — for every oracle-compared double
    * column. */
  def roundBin(c: Column, scale: Int): Column =
    call_function("round_bin", c.cast("double"), lit(scale))

  def simhash64(c: Column): Column = call_function("simhash64", c)

  def minhashSig(c: Column, numHashes: Int): Column =
    call_function("minhash_sig", c, lit(numHashes))

  def minhashBandHashes(c: Column, numHashes: Int, bands: Int): Column =
    call_function("minhash_band_hashes", c, lit(numHashes), lit(bands))

  def cosineSim(a: Column, b: Column): Column = call_function("cosine_sim", a, b)

  /** Aggregate: element-wise-min union of MinHash signatures. */
  def minhashUnion(sig: Column, numHashes: Int): Column =
    call_function("minhash_union", sig, lit(numHashes))

  def l2Norm(c: Column): Column = call_function("l2_norm", c)

  /** IVF assignment: nearest centroid id by cosine (see
    * [[NearestCentroid]]); `cents` is array<struct<c_id,cv>>. */
  def nearestCentroid(v: Column, cents: Column): Column =
    call_function("nearest_centroid", v, cents)

  /** Packed sign-bit LSH bucket id (see [[HyperplaneBucket]]). */
  def hyperplaneBucket(c: Column, bits: Int): Column =
    call_function("hyperplane_bucket", c, lit(bits))
}
