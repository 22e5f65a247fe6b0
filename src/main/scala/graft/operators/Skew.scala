package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot keys.
  *
  * AQE's skew-join splitting handles moderate skew at runtime; explicit
  * salting is for the pathological case (one key holding a double-digit
  * percentage of rows) where even a split partition's build side is too hot.
  *
  * `saltedJoin` spreads the skewed (large) side across `salt` sub-keys with
  * a deterministic per-row salt and replicates the small side `salt` times —
  * an inner equi-join on (key, salt) that is row-for-row equivalent to the
  * plain join.
  */
object Skew {

  /** Deterministic per-row salt in [0, salt): cheap, codegen'd, and
    * independent of row order (derived from the row's own columns).
    */
  def saltOf(salt: Int, cols: Column*): Column =
    pmod(hash(cols: _*), lit(salt))

  /** Inner join `big ⋈ small` on `key`, with `big` spread over `salt`
    * sub-keys. `small` is replicated `salt`× and broadcast-sized inputs stay
    * broadcast (replication factor `salt`, applied before the join).
    */
  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      key: String,
      salt: Int = 16,
      saltByCols: Seq[String] = Nil): DataFrame = {
    val saltSrc =
      if (saltByCols.nonEmpty) saltByCols.map(col)
      else big.columns.filterNot(_ == key).map(col).toSeq
    val b = big.withColumn("_salt", saltOf(salt, saltSrc: _*))
    val s = small
      .withColumn("_salt", explode(sequence(lit(0), lit(salt - 1))))
    b.join(s, Seq(key, "_salt")).drop("_salt")
  }
}
