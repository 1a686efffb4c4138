package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines.
  *
  * Sampling at 100 TB must be reproducible (re-runs and engines agree),
  * stateless (no RNG seeds to thread through retries/speculative tasks),
  * and embarrassingly parallel. Hash-based acceptance gives all three:
  * a row is kept iff a content-stable hash of its id falls below the
  * stratum's threshold — a pure codegen'd filter, no shuffle, identical
  * output on any cluster layout.
  */
object Sampling {

  /** Per-row acceptance hash: first byte of md5("smp" || id), as hex.
    * Uniform over 256 values; portable (any engine with md5 agrees). */
  def acceptanceHash(idCol: Column): Column =
    substring(md5(concat(lit("smp"), idCol.cast("string")).cast("binary")),
      1, 2)

  /** Keep rows whose acceptance hash is below the (possibly per-stratum)
    * two-hex-digit threshold: "40" keeps 64/256 = 25%, "80" keeps 50%. */
  def stratifiedByHash(
      df: DataFrame, idCol: Column, thresholdHex: Column): DataFrame =
    df.filter(acceptanceHash(idCol) < thresholdHex)
}
