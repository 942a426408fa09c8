package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed ordered prefix sum — the scalable form of
  * `SUM(...) OVER (ORDER BY ... ROWS UNBOUNDED PRECEDING)`.
  *
  * A global-order running sum is the shape behind training-shard
  * packing ("assign each doc to the shard where its cumulative token
  * budget lands"), but the naive window with no PARTITION BY collapses
  * to ONE task holding the whole dataset — the exact degradation
  * WindowExec warns about. The classic fix is a two-phase scan:
  *
  *  1. range-partition on the order key (so partition i holds rows
  *     strictly before partition i+1) and sum each partition locally;
  *  2. collect ONE long per partition — bounded driver state, same
  *     budget class as IVF centroids — prefix-sum those on the
  *     driver, and broadcast each partition's exclusive offset back;
  *  3. every partition computes its local running sum in parallel and
  *     adds its offset.
  *
  * Cost: the range exchange, a per-partition-sums job over the cached
  * frame, and the pid-clustered window (Spark re-clusters by pid —
  * partition-sized tasks, never a global collapse). Parallelism is
  * full at every step; driver state is `numPartitions` longs.
  *
  * `orderBy` must be a TOTAL order (e.g. (md5(text), doc_id)):
  * range-partition boundaries between equal keys would otherwise make
  * the partition-local sums nondeterministic.
  */
object PrefixSum {

  /** Adds `outCol` = inclusive running sum of `value` (cast to long)
    * over the global `orderBy` order. The input is materialized via
    * [[graft.CacheScope.trackedCache]] (the partial-sums job and the
    * final pass must see identical partitioning).
    */
  def orderedRunningSum(df: DataFrame, orderBy: Seq[Column], value: Column,
      outCol: String, numPartitions: Int): DataFrame =
    orderedRunningSums(df, orderBy, Seq(value -> outCol), numPartitions)

  /** Multi-measure form of [[orderedRunningSum]]: every
    * `(value, outCol)` pair rides the SAME range exchange, the same
    * bounded driver collect (numPartitions × |values| longs), and the
    * same per-partition window pass — one scan no matter how many
    * running sums the caller needs (q171's two-sample ECDF wants cum₁
    * AND cum₂ over one total order; paying the exchange twice would
    * double the dominant cost).
    */
  def orderedRunningSums(df: DataFrame, orderBy: Seq[Column],
      values: Seq[(Column, String)], numPartitions: Int): DataFrame = {
    require(numPartitions > 0, "numPartitions must be positive")
    require(values.nonEmpty, "need at least one (value, outCol) pair")
    val spark = df.sparkSession
    val ranged = graft.CacheScope.trackedCache(
      df.repartitionByRange(numPartitions, orderBy: _*)
        .withColumn("graft_pid", spark_partition_id()))
    // coalesce: a partition whose every value is NULL sums to NULL
    // (SQL semantics) — treat it as contributing nothing rather than
    // NPE-ing the driver fold
    val sumCols = values.zipWithIndex.map { case ((v, _), i) =>
      coalesce(sum(v.cast("long")), lit(0L)).as(s"graft_s$i") }
    val partials: Map[Int, Seq[Long]] = ranged.groupBy(col("graft_pid"))
      .agg(sumCols.head, sumCols.tail: _*)
      .collect()
      .map(r => r.getInt(0) -> values.indices.map(i => r.getLong(i + 1)))
      .toMap
    val maxPid = if (partials.isEmpty) -1 else partials.keys.max
    val zero: Seq[Long] = values.indices.map(_ => 0L)
    val offsets = (0 to maxPid)
      .scanLeft(zero)((acc, p) =>
        acc.zip(partials.getOrElse(p, zero)).map { case (a, b) => a + b })
      .dropRight(1)
    val offsetSchema = org.apache.spark.sql.types.StructType(
      org.apache.spark.sql.types.StructField("graft_pid",
        org.apache.spark.sql.types.IntegerType) +:
        values.indices.map(i => org.apache.spark.sql.types.StructField(
          s"graft_off$i", org.apache.spark.sql.types.LongType)))
    val offsetRows = offsets.zipWithIndex.map { case (o, p) =>
      org.apache.spark.sql.Row.fromSeq(p +: o) }
    val offsetDf = spark.createDataFrame(
      spark.sparkContext.parallelize(offsetRows, 1), offsetSchema)
    val w = Window.partitionBy(col("graft_pid")).orderBy(orderBy: _*)
    val joined = ranged.join(broadcast(offsetDf), Seq("graft_pid"))
    values.zipWithIndex.foldLeft(joined) { case (acc, ((v, outCol), i)) =>
      acc.withColumn(outCol, sum(v.cast("long")).over(w) + col(s"graft_off$i"))
    }.drop("graft_pid" +: values.indices.map(i => s"graft_off$i"): _*)
  }

  /** Adds `outCol` = NTILE(`buckets`) over the global `orderBy` total
    * order — the distributed form of `ntile(k).over(Window.orderBy(…))`,
    * which would otherwise collapse the whole frame into ONE
    * WindowExec task. The rank comes from [[orderedRunningSum]] of 1s;
    * the rank→bucket map is the SQL-standard NTILE split in exact
    * int64 arithmetic (q = n div k, r = n mod k; the first r buckets
    * hold q+1 rows), so the result is bit-identical to the engines'
    * NTILE on the same total order. `orderBy` must be a TOTAL order.
    * Output type is long (matches a BIGINT oracle column).
    */
  def globalNtile(df: DataFrame, orderBy: Seq[Column], buckets: Int,
      outCol: String, numPartitions: Int): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    val ranked = orderedRunningSum(df, orderBy, lit(1L), "graft_ntile_i",
      numPartitions)
    val nTot = ranked.agg(count(lit(1)).cast("long").as("graft_ntile_n"))
    ranked.crossJoin(broadcast(nTot))
      .withColumn(outCol, expr(
        s"""CASE WHEN graft_ntile_i <=
           |    (graft_ntile_n % $buckets) * (graft_ntile_n div $buckets + 1)
           |  THEN (graft_ntile_i - 1) div (graft_ntile_n div $buckets + 1) + 1
           |  ELSE (graft_ntile_n % $buckets)
           |    + (graft_ntile_i
           |       - (graft_ntile_n % $buckets) * (graft_ntile_n div $buckets + 1)
           |       - 1) div (graft_ntile_n div $buckets) + 1 END""".stripMargin))
      .drop("graft_ntile_i", "graft_ntile_n")
  }
}
