package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{GraftSession, Tables}

/** sf1 testdata generator: scales the driver's sf0.1 tables 10x by
  * key-offset replication, preserving referential integrity and value
  * distributions exactly (TESTDATA.md tops out at sf0.1; VERDICT r6
  * item 5 asks for scale evidence one decade above the bench SF).
  *
  * Scaling rules (copy k in 0..9; copy 0 is the original data):
  *  - region/nation: fixed dims, copied as-is (TPC-H semantics —
  *    dims don't grow with SF).
  *  - customer/supplier/part/orders/lineitem/events: every key column
  *    is offset by k * (1 + max key at sf0.1) so each copy is a
  *    disjoint, internally-consistent universe: orders→customer,
  *    lineitem→{orders,part,supplier}, events.user_id cohorts all
  *    stay aligned within a copy. Per-key row counts (orders per
  *    customer, events per user) are invariant, so group cardinality
  *    grows 10x while per-group size stays fixed — the shape a
  *    10x-bigger production corpus actually has.
  *  - documents: doc_id offset; for k>0 each token is deterministically
  *    replaced with probability ~1/3 by a hash-picked vocab token,
  *    keyed on (k, position, token) — content-keyed, NOT doc_id-keyed,
  *    so exact-duplicate groups survive within a copy (dup RATE stays
  *    constant) while cross-copy pairs fall to ~0.18 word-3-gram
  *    jaccard (≈ (2/3)^3 shingle survival), i.e. BELOW near-dup
  *    thresholds: LSH pair volume grows linearly with corpus size
  *    instead of quadratically across clone pairs. n_chars is
  *    recomputed from the rewritten text.
  *  - embeddings: vec_id offset; for k>0 dimension i is sign-flipped
  *    iff bit(hash(k,i)) — a diagonal orthogonal transform per copy:
  *    intra-copy geometry (norms, pairwise cosines, label clusters) is
  *    preserved BIT-EXACTLY, cross-copy cosines scramble to ~0, so
  *    ANN recall structure is 10 independent replicas, not 10 clones.
  *
  * Determinism: every choice is a pure function of (copy, position,
  * token) / (copy, dim) via splitmix64 — independent of partitioning,
  * task order, or row order. Run twice → identical bytes.
  */
object GenScale {
  final val Copies = 10

  /** splitmix64 finalizer — deterministic, partition-independent. */
  @inline private def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d33d479ab84b5fL
    z ^ (z >>> 31)
  }

  def main(args: Array[String]): Unit = {
    val srcDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val outDir = if (args.length > 1) args(1) else "/root/repo/testdata-sf1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt
    val spark = GraftSession.local(cpus)
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val t = Tables(spark, srcDir)

    def write(df: DataFrame, name: String, parts: Int): Unit =
      df.repartition(parts).write.mode("overwrite")
        .parquet(s"$outDir/$name.parquet")

    // ---- fixed dims --------------------------------------------------
    write(t.region, "region", 1)
    write(t.nation, "nation", 1)

    // ---- key-offset replication -------------------------------------
    // A one-row-per-copy frame cross-joined (broadcast — 10 literal
    // rows) onto each table; offsets are copy * stride.
    val copies = spark.range(Copies).select(col("id").as("graft_copy"))
    def replicate(df: DataFrame): DataFrame =
      df.crossJoin(broadcast(copies))
    def off(c: String, stride: Long) = col(c) + col("graft_copy") * stride

    write(replicate(t.customer)
      .withColumn("c_custkey", off("c_custkey", 15000L))
      .withColumn("c_name", format_string("Customer#%09d", col("c_custkey")))
      .drop("graft_copy"), "customer", 4)

    write(replicate(t.supplier)
      .withColumn("s_suppkey", off("s_suppkey", 1000L))
      .withColumn("s_name", format_string("Supplier#%09d", col("s_suppkey")))
      .drop("graft_copy"), "supplier", 1)

    write(replicate(t.part)
      .withColumn("p_partkey", off("p_partkey", 20000L))
      .drop("graft_copy"), "part", 4)

    write(replicate(t.orders)
      .withColumn("o_orderkey", off("o_orderkey", 150000L))
      .withColumn("o_custkey", off("o_custkey", 15000L))
      .drop("graft_copy"), "orders", 8)

    write(replicate(t.lineitem)
      .withColumn("l_orderkey", off("l_orderkey", 150000L))
      .withColumn("l_partkey", off("l_partkey", 20000L))
      .withColumn("l_suppkey", off("l_suppkey", 1000L))
      .drop("graft_copy"), "lineitem", 16)

    // user_id is a FOREIGN KEY into customer (c_custkey), not its own
    // key domain: sf0.1 users span 0..1499 inside c_custkey 0..14999.
    // Offsetting by the CUSTOMER stride keeps copy k's events pointing
    // at copy k's customers ("first 1500 customers of each copy are the
    // event users" — the sf0.1 shape, replicated); the user-domain
    // stride (1500) would aim every copy's events at copy-0 customers.
    write(replicate(t.events)
      .withColumn("event_id", off("event_id", 100000L))
      .withColumn("user_id", off("user_id", 15000L))
      .drop("graft_copy"), "events", 8)

    // ---- documents: content-keyed token perturbation ----------------
    val vocab: Array[String] = t.documents
      .select(explode(split(col("text"), " ")).as("tok"))
      .distinct().as[String].collect().sorted
    val vb = spark.sparkContext.broadcast(vocab)
    val perturb = udf { (text: String, copy: Long) =>
      if (copy == 0L) text
      else {
        val v = vb.value
        val toks = text.split(' ')
        var i = 0
        while (i < toks.length) {
          val h = mix(mix(copy * 1000003L + i) ^ toks(i).hashCode.toLong)
          if (java.lang.Long.remainderUnsigned(h, 3L) == 0L)
            toks(i) = v(java.lang.Long.remainderUnsigned(h >>> 8, v.length.toLong).toInt)
          i += 1
        }
        toks.mkString(" ")
      }
    }
    write(replicate(t.documents)
      .withColumn("doc_id", off("doc_id", 5000L))
      .withColumn("text", perturb(col("text"), col("graft_copy")))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .drop("graft_copy"), "documents", 4)

    // ---- embeddings: per-copy diagonal orthogonal transform ---------
    val flip = udf { (emb: Seq[Float], copy: Long) =>
      if (copy == 0L) emb
      else emb.zipWithIndex.map { case (x, i) =>
        if ((mix(copy * 7919L + i) & 1L) == 1L) -x else x
      }
    }
    write(replicate(t.embeddings)
      .withColumn("vec_id", off("vec_id", 2000L))
      .withColumn("embedding", flip(col("embedding"), col("graft_copy")))
      .drop("graft_copy"), "embeddings", 2)

    // ---- summary -----------------------------------------------------
    val names = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    names.foreach { n =>
      val c = spark.read.parquet(s"$outDir/$n.parquet").count()
      println(f"[gen] $n%-12s $c%9d rows")
    }
    spark.stop()
  }
}
