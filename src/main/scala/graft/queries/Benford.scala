package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Q
import graft.functions.det

/** q143: BENFORD first-digit audit — the classic fabricated-data /
  * broken-generator detector (Newcomb 1881, Benford 1938, public):
  * the leading significant digit of naturally-spread amounts follows
  * P(d) = log10(1 + 1/d), and a feed whose invoices/latencies/prices
  * deviate hard is synthetic, truncated, or tampered. The audit
  * emits the observed-vs-expected table for `l_extendedprice` plus
  * the chi-square statistic — the q93 data-quality ledger's
  * distributional cousin (and an honest NEGATIVE control here: the
  * testdata's uniform price generator is NOT Benford-distributed, so
  * the statistic is huge, which is exactly what the audit should say
  * about a synthetic feed).
  *
  * Determinism: the digit is extracted INTEGER-only — floor to
  * BIGINT, cast to string, first char (values ≥ 1 here; no
  * double→string formatting, no log10-of-value floor whose 1-ulp
  * wobble at exact powers of ten could flip a bucket). Counts are
  * exact; each expected probability log10(1+1/d) is QUANTIZED to
  * DECIMAL(18,6) (the q129 libm rule — 9 distinct values), expected
  * count = exact decimal × exact count, and the chi-square sum runs
  * over 9 continuous double terms routed through DECIMAL(20,6) (§6
  * order-independence).
  *
  * Scale shape: ONE map-side-combined aggregate to the 9-cell digit
  * frame (the only fact-sized work is the scan projection), a
  * broadcast-able 9-row spine join so zero-count digits still charge
  * their expected mass, windows only over the 9-row frame.
  */
object Benford {

  /** Benford table over the positive (≥ 1) values of `valCol`:
    * per-digit observed/expected counts and the shared chi-square.
    * Factored so the spec can pin a hand-built exact-Benford sample
    * (chi2 ≈ 0) and a constant-digit counterexample.
    */
  def audit(df: DataFrame, valCol: String): DataFrame = {
    val observed = df
      .filter(col(valCol) >= 1.0)
      .select(substring(floor(col(valCol)).cast("long").cast("string"), 1, 1)
        .cast("int").as("digit"))
      .groupBy(col("digit"))
      .agg(count(lit(1)).as("n_obs"))
    val spine = df.sparkSession.range(1, 10).select(col("id").cast("int").as("digit"))
    val whole = Window.partitionBy()
    spine
      .join(observed, Seq("digit"), "left")
      .withColumn("n_obs", coalesce(col("n_obs"), lit(0L)))
      .withColumn("n_total", sum(col("n_obs")).over(whole))
      .withColumn("graft_p",
        log10(lit(1.0) + lit(1.0) / col("digit").cast("double"))
          .cast(det.D18_6))
      .withColumn("expected", (col("graft_p") * col("n_total")).cast("double"))
      .withColumn("graft_chi_term",
        pow(col("n_obs").cast("double") - col("expected"), 2) / col("expected"))
      .withColumn("chi2",
        sum(col("graft_chi_term").cast(det.D20_6)).over(whole).cast("double"))
      .select(col("digit"), col("n_obs"), col("n_total"), col("expected"), col("chi2"))
  }

  val q143 = Q.of(
    "q143_benford_audit",
    """WITH observed AS (
      |  SELECT CAST(substr(CAST(CAST(FLOOR(l_extendedprice) AS BIGINT) AS VARCHAR), 1, 1)
      |           AS INTEGER) AS digit,
      |    COUNT(*) AS n_obs
      |  FROM lineitem WHERE l_extendedprice >= 1.0
      |  GROUP BY 1
      |), spine AS (
      |  SELECT CAST(range AS INTEGER) AS digit FROM range(1, 10)
      |), joined AS (
      |  SELECT s.digit, COALESCE(o.n_obs, 0) AS n_obs
      |  FROM spine s LEFT JOIN observed o ON s.digit = o.digit
      |), scored AS (
      |  SELECT digit, n_obs,
      |    SUM(n_obs) OVER () AS n_total,
      |    CAST(CAST(log10(1.0 + 1.0 / CAST(digit AS DOUBLE)) AS DECIMAL(18,6))
      |      * SUM(n_obs) OVER () AS DOUBLE) AS expected
      |  FROM joined
      |)
      |SELECT digit,
      |  CAST(n_obs AS BIGINT) AS n_obs,
      |  CAST(n_total AS BIGINT) AS n_total,
      |  expected,
      |  CAST(SUM(CAST(pow(CAST(n_obs AS DOUBLE) - expected, 2) / expected
      |    AS DECIMAL(20,6))) OVER () AS DOUBLE) AS chi2
      |FROM scored
      |ORDER BY digit""".stripMargin) { t =>
    audit(t.lineitem, "l_extendedprice").orderBy(col("digit"))
  }

  def all: Seq[Q] = Seq(q143)
}
