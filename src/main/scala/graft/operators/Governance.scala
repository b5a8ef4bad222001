package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-governance operators: deterministic pseudonymization and
  * k-anonymity suppression — the privacy half of a warehouse that ships
  * extracts to analysts and training corpora to model teams.
  *
  * Both are pure column algebra (no token vault, no RNG): a salted-hash
  * pseudonym keeps referential integrity ACROSS tables (the same key maps
  * to the same pseudonym everywhere, so joins still work on masked data)
  * while being non-invertible without the salt; k-anonymity generalizes a
  * quasi-identifier combination to `*` wherever fewer than k individuals
  * share it, which is a windowed group count — one keyed shuffle, no
  * collect, scale-indifferent.
  */
object Governance {

  /** Deterministic pseudonym for a key: `prefix_` + first 16 md5 hex chars
    * of salt:key. Same (salt, key) → same pseudonym in every table and
    * every engine; 64 bits keeps the birthday bound negligible below ~2^32
    * distinct subjects (raise to the full digest for a planetary keyspace).
    */
  def pseudonym(key: Column, salt: String, prefix: String = "anon"): Column =
    concat(lit(prefix), lit("_"), substring(md5(concat(lit(salt), lit(":"), key.cast("string"))), 1, 16))

  /** k-anonymity enforcement over a quasi-identifier set: rows whose exact
    * QI combination is shared by ≥ k rows keep their QI values; rarer rows
    * have every QI column REPLACED by "*" (full suppression — the coarsest
    * generalization step, and the only engine-portable one without a
    * taxonomy). Group size is computed by one aggregate and joined back
    * (map-side-combined count, AQE broadcasts the group table when small) —
    * no window over the full row stream.
    */
  def kAnonymize(df: DataFrame, qiCols: Seq[String], k: Long): DataFrame = {
    require(qiCols.nonEmpty, "need at least one quasi-identifier column")
    require(k >= 1, s"k=$k must be >= 1")
    require(!df.columns.contains("_qn"), "df must not contain reserved column '_qn'")
    require(!df.columns.exists(_.startsWith("_qi_")),
      "df must not contain reserved '_qi_*' columns")
    val qi = qiCols.map(col)
    val sizes = df.groupBy(qi: _*).agg(count(lit(1)).as("_qn"))
      .select(qiCols.map(c => col(c).as("_qi_" + c)) :+ col("_qn"): _*)
    // null-safe (<=>) join keys: groupBy already treats NULL as a regular
    // key value, so rows with a NULL QI must find their group size too —
    // plain equality would silently drop them from the masked extract,
    // breaking the operator's row-count-preservation contract
    val cond = qiCols.map(c => col(c) <=> col("_qi_" + c)).reduce(_ && _)
    val keep = col("_qn") >= k
    val masked = df.join(sizes, cond)
    qiCols
      .foldLeft(masked) { (d, c) =>
        d.withColumn(c, when(keep, col(c).cast("string")).otherwise(lit("*")))
      }
      .drop("_qn")
      .drop(qiCols.map("_qi_" + _): _*)
  }
}
