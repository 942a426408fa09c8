package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.Q
import graft.functions.det

/** q219: PRICE/VOLUME/MIX WATERFALL — the revenue variance
  * decomposition (Laspeyres price-volume bridge, standard FP&A /
  * index-number practice, public): the year-over-year revenue change
  * split into what VOLUME did (Δq at old prices), what PRICE did
  * (Δp at old volumes), the CROSS term, and the NEW/DISCONTINUED
  * item buckets — the "why did revenue move" answer q149's growth
  * percentages can't give. Emits one row with every component and a
  * reconciliation flag.
  *
  * Determinism — the ALL-INTEGER bridge: this query went through two
  * broken designs worth recording. Quantizing the per-item IEEE terms
  * Δq·p₀ to D18_6 fails because rev/q rationals land on the 1e-6
  * HALF-TIE lattice where the engines' double→decimal rounding
  * disagrees (§6(i)); re-rounding the sums to cents fails the same
  * way one decade up (revenue sums end in exact .xx5 routinely). The
  * working design has NO floating point and NO rounding mode at all:
  * work in micro-dollar int64 units (revenues have ≤ 6 decimals, so
  * rev·10⁶ is exact; quantities are integers), and compute
  * vol = Δq·R₀ / q₀ with a deterministic rounded division built from
  * remainder-normalized exact division — m = ((a % b) + b) % b;
  * (a − m) is exactly divisible, so Spark `div` and DuckDB `//`
  * agree regardless of their floor-vs-truncate semantics. The cross
  * term is ΔR − vol − price in exact int64, so
  * Σcomponents = R₁ − R₀ holds EXACTLY and the reconciliation flag
  * is an integer compare. Output dollars are int64→double casts
  * (correctly rounded in both engines) and one IEEE division by 1e6.
  * Headroom: the 2·Δq·R₀ products stay under int64 through sf1 with
  * ~4x margin; DECIMAL(38,0) is the escape hatch.
  *
  * Scale shape: ONE fact scan builds per-(item, period) cells as
  * conditional sums (no join, no second pass); item-grain effect
  * terms are a projection; one-row fold. The exchange carries item
  * cells only.
  */
object Waterfall {

  private val D38_0 = org.apache.spark.sql.types.DataTypes.createDecimalType(38, 0)
  private val D25_6 = org.apache.spark.sql.types.DataTypes.createDecimalType(25, 6)

  /** Round-half-up(a / b) for b > 0 via exact integer ops only:
    * floor((2a + b) / (2b)) with the remainder-normalized divide —
    * (num − m) is exactly divisible by den, so the decimal division
    * is exact and the long cast lossless (a plain `/` on longs would
    * detour through double and lose exactness past 2^53). */
  private def rhu(a: Column, b: Column): Column = {
    val num = lit(2L) * a + b
    val den = lit(2L) * b
    val m = pmod(num, den)
    ((num - m).cast(D38_0) / den.cast(D38_0)).cast("long")
  }

  /** Decompose Σrev between period-0 and period-1 item cells.
    * Input: (item, q0, rev0, q1, rev1) decimals with zeros for absent
    * sides; quantities integer-valued, revenues ≤ 6 decimals.
    * Factored so the spec can pin a hand-built bridge (pure-volume,
    * pure-price, mixed, new, discontinued) and the exact identity.
    */
  def bridge(cells: DataFrame): DataFrame = {
    val micro = cells.select(
      (col("rev0").cast(D25_6) * 1000000).cast("long").as("graft_r0"),
      (col("rev1").cast(D25_6) * 1000000).cast("long").as("graft_r1"),
      col("q0").cast("long").as("graft_q0"),
      col("q1").cast("long").as("graft_q1"))
    val inBoth = col("graft_q0") > 0 && col("graft_q1") > 0
    val vol = rhu((col("graft_q1") - col("graft_q0")) * col("graft_r0"),
      col("graft_q0"))
    val price = rhu(col("graft_q0") * col("graft_r1"), col("graft_q1")) -
      col("graft_r0")
    val terms = micro.select(
      col("graft_r0"), col("graft_r1"),
      when(inBoth, vol).otherwise(0L).as("graft_vol"),
      when(inBoth, price).otherwise(0L).as("graft_price"),
      when(inBoth, col("graft_r1") - col("graft_r0") - vol - price)
        .otherwise(0L).as("graft_cross"),
      when(col("graft_q0") === 0 && col("graft_q1") > 0, col("graft_r1"))
        .otherwise(0L).as("graft_new"),
      when(col("graft_q1") === 0 && col("graft_q0") > 0, -col("graft_r0"))
        .otherwise(0L).as("graft_disc"))
    val f = terms.agg(
      sum(col("graft_r0")).as("graft_sr0"),
      sum(col("graft_r1")).as("graft_sr1"),
      sum(col("graft_vol")).as("graft_v"),
      sum(col("graft_price")).as("graft_p"),
      sum(col("graft_cross")).as("graft_x"),
      sum(col("graft_new")).as("graft_n"),
      sum(col("graft_disc")).as("graft_d"))
    f.select(
      (col("graft_sr0").cast("double") / lit(1000000.0)).as("revenue_p0"),
      (col("graft_sr1").cast("double") / lit(1000000.0)).as("revenue_p1"),
      (col("graft_v").cast("double") / lit(1000000.0)).as("volume_effect"),
      (col("graft_p").cast("double") / lit(1000000.0)).as("price_effect"),
      (col("graft_x").cast("double") / lit(1000000.0)).as("cross_effect"),
      (col("graft_n").cast("double") / lit(1000000.0)).as("new_items"),
      (col("graft_d").cast("double") / lit(1000000.0)).as("discontinued_items"),
      (col("graft_v") + col("graft_p") + col("graft_x")
        + col("graft_n") + col("graft_d")
        === col("graft_sr1") - col("graft_sr0")).as("reconciles"))
  }

  val q219 = Q.of(
    "q219_pvm_waterfall",
    """WITH cells AS (
      |  SELECT l_partkey AS item,
      |    SUM(CAST(CASE WHEN l_shipdate >= DATE '1995-01-01'
      |          AND l_shipdate < DATE '1996-01-01'
      |        THEN l_quantity ELSE 0 END AS DECIMAL(20,6))) AS q0,
      |    SUM(CAST(CASE WHEN l_shipdate >= DATE '1995-01-01'
      |          AND l_shipdate < DATE '1996-01-01'
      |        THEN l_extendedprice * (1 - l_discount) ELSE 0 END
      |        AS DECIMAL(20,6))) AS rev0,
      |    SUM(CAST(CASE WHEN l_shipdate >= DATE '1996-01-01'
      |          AND l_shipdate < DATE '1997-01-01'
      |        THEN l_quantity ELSE 0 END AS DECIMAL(20,6))) AS q1,
      |    SUM(CAST(CASE WHEN l_shipdate >= DATE '1996-01-01'
      |          AND l_shipdate < DATE '1997-01-01'
      |        THEN l_extendedprice * (1 - l_discount) ELSE 0 END
      |        AS DECIMAL(20,6))) AS rev1
      |  FROM lineitem
      |  WHERE l_shipdate >= DATE '1995-01-01'
      |    AND l_shipdate < DATE '1997-01-01'
      |  GROUP BY 1
      |), micro AS (
      |  SELECT
      |    CAST(CAST(rev0 AS DECIMAL(25,6)) * 1000000 AS BIGINT) AS r0,
      |    CAST(CAST(rev1 AS DECIMAL(25,6)) * 1000000 AS BIGINT) AS r1,
      |    CAST(q0 AS BIGINT) AS q0,
      |    CAST(q1 AS BIGINT) AS q1
      |  FROM cells
      |), terms AS (
      |  SELECT r0, r1,
      |    CASE WHEN q0 > 0 AND q1 > 0 THEN
      |      (2 * ((q1 - q0) * r0) + q0
      |       - (((2 * ((q1 - q0) * r0) + q0) % (2 * q0) + 2 * q0) % (2 * q0)))
      |      // (2 * q0)
      |    ELSE 0 END AS vol,
      |    CASE WHEN q0 > 0 AND q1 > 0 THEN
      |      (2 * (q0 * r1) + q1
      |       - (((2 * (q0 * r1) + q1) % (2 * q1) + 2 * q1) % (2 * q1)))
      |      // (2 * q1) - r0
      |    ELSE 0 END AS price,
      |    CASE WHEN q0 > 0 AND q1 > 0 THEN
      |      r1 - r0
      |      - ((2 * ((q1 - q0) * r0) + q0
      |          - (((2 * ((q1 - q0) * r0) + q0) % (2 * q0) + 2 * q0) % (2 * q0)))
      |         // (2 * q0))
      |      - ((2 * (q0 * r1) + q1
      |          - (((2 * (q0 * r1) + q1) % (2 * q1) + 2 * q1) % (2 * q1)))
      |         // (2 * q1) - r0)
      |    ELSE 0 END AS crs,
      |    CASE WHEN q0 = 0 AND q1 > 0 THEN r1 ELSE 0 END AS newi,
      |    CASE WHEN q1 = 0 AND q0 > 0 THEN -r0 ELSE 0 END AS disc
      |  FROM micro
      |), f AS (
      |  SELECT
      |    CAST(SUM(r0) AS BIGINT) AS sr0,
      |    CAST(SUM(r1) AS BIGINT) AS sr1,
      |    CAST(SUM(vol) AS BIGINT) AS v,
      |    CAST(SUM(price) AS BIGINT) AS p,
      |    CAST(SUM(crs) AS BIGINT) AS x,
      |    CAST(SUM(newi) AS BIGINT) AS n,
      |    CAST(SUM(disc) AS BIGINT) AS d
      |  FROM terms
      |)
      |SELECT
      |  CAST(sr0 AS DOUBLE) / 1000000.0 AS revenue_p0,
      |  CAST(sr1 AS DOUBLE) / 1000000.0 AS revenue_p1,
      |  CAST(v AS DOUBLE) / 1000000.0 AS volume_effect,
      |  CAST(p AS DOUBLE) / 1000000.0 AS price_effect,
      |  CAST(x AS DOUBLE) / 1000000.0 AS cross_effect,
      |  CAST(n AS DOUBLE) / 1000000.0 AS new_items,
      |  CAST(d AS DOUBLE) / 1000000.0 AS discontinued_items,
      |  v + p + x + n + d = sr1 - sr0 AS reconciles
      |FROM f""".stripMargin) { t =>
    val p0c = col("l_shipdate") >= lit("1995-01-01").cast("date") &&
      col("l_shipdate") < lit("1996-01-01").cast("date")
    val p1c = col("l_shipdate") >= lit("1996-01-01").cast("date") &&
      col("l_shipdate") < lit("1997-01-01").cast("date")
    val rev = col("l_extendedprice") * (lit(1) - col("l_discount"))
    bridge(
      t.lineitem
        .filter(col("l_shipdate") >= lit("1995-01-01").cast("date") &&
          col("l_shipdate") < lit("1997-01-01").cast("date"))
        .groupBy(col("l_partkey").as("item"))
        .agg(
          sum(when(p0c, col("l_quantity")).otherwise(lit(0))
            .cast(det.D20_6)).as("q0"),
          sum(when(p0c, rev).otherwise(lit(0)).cast(det.D20_6)).as("rev0"),
          sum(when(p1c, col("l_quantity")).otherwise(lit(0))
            .cast(det.D20_6)).as("q1"),
          sum(when(p1c, rev).otherwise(lit(0)).cast(det.D20_6)).as("rev1")))
  }

  def all: Seq[Q] = Seq(q219)
}
