package graft

import org.apache.spark.sql.functions._

/** AQE skew-join handling — the engine-level complement to q26's
  * manual salting: at 100 TB a hot join key lands one reducer with a
  * partition orders of magnitude over its peers, and AQE's runtime
  * skew splitter carves that partition into sub-splits (replicating
  * the matching build side) WITHOUT any query rewrite. SURVEY §5
  * names this as the standing mitigation; this spec pins that it
  * actually fires (the `skew=true` marker on the join) and that the
  * result is identical with the optimization off — split-and-replicate
  * must be semantically invisible.
  *
  * Production thresholds gate on 256 MB partitions; the spec scopes
  * them down to the fixture. The salting pattern (q26) remains the
  * portable fallback; this pins the zero-rewrite path.
  */
class SkewSpec extends SparkSpec {

  private def skewedJoin() = {
    import spark.implicits._
    // one hot key carrying ~99% of the probe side; the payload is kept
    // ALIVE through the join by the aggregate (column pruning must not
    // slim the skewed exchange down to the key)
    val probe = spark.range(0, 60000)
      .select(
        when(col("id") % 100 =!= 0, lit(7L))
          .otherwise((col("id") / 100) % 50).as("k"),
        concat(lit("payload-"), col("id"), lit("-"), md5(col("id").cast("string"))).as("p"))
    val build = spark.range(0, 50).select(col("id").as("k"),
      concat(lit("dim-"), col("id")).as("d"))
    probe.join(build, "k")
      .groupBy(col("d")).agg(count(lit(1)).as("n"),
        sum(length(col("p"))).as("payload_chars"))
      .orderBy(col("d"))
  }

  private def withSkewConf[T](on: Boolean)(f: => T): T =
    withConf("spark.sql.adaptive.skewJoin.enabled", on.toString) {
      withConf("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1") {
        withConf("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB") {
          withConf("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB") {
            // keep the join in the shuffle regime AQE's splitter targets
            withConf("spark.sql.autoBroadcastJoinThreshold", "-1") {
              withConf("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1") {
                withConf("spark.sql.adaptive.coalescePartitions.enabled", "false")(f)
              }
            }
          }
        }
      }
    }

  test("AQE splits the skewed partition and the result is unchanged") {
    val (plan, rows) = withSkewConf(on = true) {
      val df = skewedJoin()
      val r = df.collect()
      (planOf(df), r)
    }
    assert(plan.contains("skew=true"), s"AQE skew split did not fire:\n$plan")
    val rowsOff = withSkewConf(on = false)(skewedJoin().collect())
    assert(rows.toSeq == rowsOff.toSeq,
      "skew splitting must not change the join result")
    // the hot key's count dominates, proving the fixture was skewed
    val byDim = rows.map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byDim("dim-7") > 50000L)
  }
}
