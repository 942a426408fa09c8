package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Co-occurrence edge generation for the graph tier (q118 / q128 /
  * q170 / q179 / q214 / q229) — pairs generated INSIDE the basket row,
  * the q141 idiom promoted to a shared operator.
  *
  * The original spelling at every site was the basket SELF-JOIN:
  * `distinct(ok, pk)` → join on ok → groupBy (pa, pb). That plan pays
  * three exchanges of fact-derived rows (the distinct, the join
  * re-shuffle onto ok, the pair aggregate) plus a sort-merge join.
  * This operator collapses the first two into ONE basket-keyed
  * aggregate: `collect_set` dedups (ok, pk) map-side exactly like the
  * distinct did, per-basket state is bounded by basket width (≤ 7
  * items/order in this domain — the q141 "bounded ~|alphabet| array"
  * argument at item grain), and the i < j double explode emits exactly
  * the rows the self-join produced — same Σ basket² volume, no join,
  * one less exchange (guide §2.3 "aggregate before you shuffle",
  * §2.4 "remove shuffles outright"). The pair aggregate that follows
  * is unchanged, so every consumer's edge SET (and the oracle) is
  * identical.
  */
object CoOccur {

  /** (pa < pb, w) co-occurrence pair counts over `(container, item)`
    * baskets: w = number of distinct baskets containing both items.
    */
  def pairCounts(baskets: DataFrame, container: String, item: String): DataFrame =
    baskets
      .groupBy(col(container).as("graft_ok"))
      .agg(sort_array(collect_set(col(item))).as("graft_items"))
      .select(col("graft_items"),
        posexplode(col("graft_items")).as(Seq("graft_i", "pa")))
      .select(col("pa"),
        explode(slice(col("graft_items"), col("graft_i") + lit(2),
          size(col("graft_items")))).as("pb"))
      .groupBy(col("pa"), col("pb"))
      .agg(count(lit(1)).as("w"))

  /** Support-pruned undirected edges (pa < pb, co-occurrence count ≥
    * `minSupport`) — the q128/q170/q179/q214/q229 graph.
    */
  def prunedEdges(baskets: DataFrame, container: String, item: String,
      minSupport: Int): DataFrame =
    pairCounts(baskets, container, item)
      .filter(col("w") >= minSupport)
      .select(col("pa"), col("pb"))

  /** Distinct DIRECTED co-occurrence edges, both orientations,
    * src != dst — the q118 graph. Distinctness is structural: the
    * pair aggregate emits each unordered pair once and the two
    * orientations of a pa < pb pair cannot collide, so no extra
    * distinct exchange is needed (the self-join spelling paid one).
    */
  def directedEdges(baskets: DataFrame, container: String, item: String): DataFrame = {
    val und = pairCounts(baskets, container, item).select(col("pa"), col("pb"))
    und.select(col("pa").as("src"), col("pb").as("dst"))
      .unionAll(und.select(col("pb").as("src"), col("pa").as("dst")))
  }
}
