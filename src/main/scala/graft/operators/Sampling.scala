package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for corpus mixing — the "take 25% of web, 100%
  * of books, 3% of logs" step every pretraining-data pipeline runs.
  *
  * Unlike `DataFrame.sample` (partition-order-dependent RNG: results change
  * with parallelism, file order, or a retry), membership here is a pure
  * function of the KEY: a Knuth multiplicative hash reduced into [0, 2^31),
  * kept when it falls under floor(fraction * 2^31). The same row is
  * therefore sampled on every run, on any cluster size, and on both engines
  * of the verification pair — the arithmetic is plain BIGINT ops that ANSI
  * SQL reproduces verbatim (q_sample pins it against DuckDB), and it never
  * overflows a signed 64-bit intermediate (key is reduced mod 2^31 before
  * the multiply: 2^31 * 2654435761 < 2^63), so Spark's ANSI mode cannot
  * throw on any input key.
  *
  * Scale shape: a pure codegen'd filter — no shuffle, no UDF, prunes at
  * full scan speed; different `salt`s give independent samples (held-out
  * splits, A/B slices).
  */
object Sampling {

  private val Knuth = 2654435761L // 2^32 / golden ratio, Knuth's constant
  private val Buckets = 1L << 31

  /** The sampling hash as a Column: pmod(pmod(pmod(key, 2^31) + salt',
    * 2^31) * K, 2^31) — uniform enough for corpus mixing, exactly
    * reproducible anywhere with 64-bit integer arithmetic. Key and salt
    * are each reduced mod 2^31 BEFORE the addition and the multiply, so no
    * intermediate can exceed 2^31 * K < 2^63 — ANSI overflow is impossible
    * for any (key, salt). */
  def bucketOf(key: Column, salt: Long = 0L): Column = {
    val saltMod = ((salt % Buckets) + Buckets) % Buckets
    pmod(
      pmod(pmod(key.cast("long"), lit(Buckets)) + lit(saltMod), lit(Buckets))
        * lit(Knuth),
      lit(Buckets))
  }

  /** Threshold for `fraction` in [0, 1]: rows with bucket < threshold are
    * kept; resolution 2^-31. */
  def thresholdOf(fraction: Double): Long = {
    require(fraction >= 0.0 && fraction <= 1.0, s"bad fraction $fraction")
    math.floor(fraction * Buckets).toLong
  }

  /** Deterministic Bernoulli sample: keeps each row iff
    * bucketOf(key, salt) < floor(fraction * 2^31). */
  def bernoulli(df: DataFrame, keyCol: String, fraction: Double,
      salt: Long = 0L): DataFrame =
    df.where(bucketOf(col(keyCol), salt) < lit(thresholdOf(fraction)))

  /** Per-stratum fractions — corpus mixing proper: each row's keep
    * threshold comes from its stratum's entry in `fractions` (exact string
    * match), else `default`. The fraction table rides the plan as a
    * codegen'd CASE chain (mixing configs are small); rows keep their
    * columns, so downstream weighting/concat sees the original schema. */
  def stratified(df: DataFrame, keyCol: String, stratumCol: String,
      fractions: Map[String, Double], default: Double = 0.0,
      salt: Long = 0L): DataFrame = {
    val thr = fractions.foldLeft(lit(thresholdOf(default))) {
      case (acc, (stratum, f)) =>
        when(col(stratumCol) === stratum, lit(thresholdOf(f))).otherwise(acc)
    }
    df.where(bucketOf(col(keyCol), salt) < thr)
  }
}
