package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Explicit key-salting for skewed joins (north_rule: hub-entity skew).
  *
  * AQE's skew-join split handles moderate skew at runtime; salting is the
  * deterministic plan-level tool when one key dominates (a hub entity with
  * 10^8 edges): the big side scatters each hot key over `salt` sub-keys,
  * the small side replicates each row `salt` times, and the join runs on
  * (key, salt) — no reducer sees more than 1/salt of a hot key.
  *
  * The reference's analog is static shard planning + round-robin task
  * distribution (/root/reference/src/sharding.rs:193-225): balance decided
  * before execution, not reactively.
  */
object SaltedJoin {

  /** Inner equi-join of `big` ⋈ `small` on `key`, salted `salt` ways.
    * Result is identical to `big.join(small, key)` — only the physical
    * distribution changes. Requires `key` to be a column of both sides.
    */
  def inner(big: DataFrame, small: DataFrame, key: String, salt: Int): DataFrame = {
    require(salt > 0)
    // Deterministic per-row scatter: hash of the whole row — any value in
    // [0, salt) preserves join semantics, determinism keeps reruns stable.
    val bigS = big.withColumn("_salt",
      pmod(xxhash64(struct(big.columns.map(col).toIndexedSeq: _*)), lit(salt))
        .cast("int"))
    val smallS = small.withColumn("_salt",
      explode(lit((0 until salt).toArray)))
    bigS.join(smallS, Seq(key, "_salt"), "inner").drop("_salt")
  }
}
