package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted join for skewed keys (SURVEY.md §5). The fact side gets a
  * deterministic pseudo-random salt in [0, numSalts); the dim side is
  * replicated once per salt value, so each (key, salt) shard carries
  * ~1/numSalts of a hot key's rows. Complements (not replaces) AQE
  * skew-join: salting also fixes skewed *aggregations* after the join,
  * which AQE's join splitting does not.
  */
object SkewJoin {
  /** `saltSeed` columns must be present on the fact side and make the
    * salt well-distributed (e.g. the fact's primary key).
    */
  def salted(fact: DataFrame, dim: DataFrame, factKey: String, dimKey: String,
      saltSeed: Seq[Column], numSalts: Int): DataFrame = {
    val saltedFact = fact.withColumn("graft_salt",
      pmod(xxhash64(saltSeed: _*), lit(numSalts.toLong)))
    val saltedDim = dim.withColumn("graft_salt",
      explode(sequence(lit(0L), lit(numSalts.toLong - 1))))
    saltedFact.join(saltedDim,
      saltedFact(factKey) === saltedDim(dimKey) &&
        saltedFact("graft_salt") === saltedDim("graft_salt"))
      .drop("graft_salt")
  }
}
