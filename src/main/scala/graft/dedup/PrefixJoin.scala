package graft.dedup

import graft.text.TextAnalysis
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Prefix-filtering EXACT set-similarity self-join (the AllPairs/PPJoin
  * family) — the no-false-negative complement to [[MinHashLsh]]: LSH trades
  * recall for speed probabilistically; prefix filtering prunes the pair
  * space with a provable guarantee, so the output is exactly every pair
  * with Jaccard ≥ t.
  *
  * The guarantee: Jaccard(A,B) ≥ t ⟹ |A∩B| ≥ t·|A| (from o(1+t) ≥
  * t(|A|+|B|) ≥ t(|A|+o)), so with both sets sorted by ONE global token
  * order, A and B must share a token among each side's first
  * n − ⌈t·n⌉ + 1 elements (pigeonhole) — pairs sharing no prefix token
  * cannot reach the threshold and are never generated.
  *
  * The global order is (corpus frequency ASC, token ASC): prefixes are
  * each document's RAREST tokens, so the candidate join is keyed on the
  * thin tail of the Zipf curve — bucket sizes stay small precisely where
  * the join fans out. That ordering is the entire scale story: at 100 TB a
  * frequency-DESC order would put every document's prefix on "the", one
  * quadratic bucket; ASC puts each prefix on near-unique shingles.
  * ⌈t·n⌉ is computed integer-exactly as (n·tNum + tDen − 1) div tDen, and
  * the threshold filter compares o·tDen ≥ tNum·(|A|+|B|−o) in integers, so
  * no floating-point decision anywhere (the emitted `jaccard` double is
  * one correctly-rounded division — engine-portable).
  *
  * Plan shape: shingle projection (no shuffle) → frequency agg (map-side
  * combine) → per-doc sort + slice (no shuffle beyond the freq join) →
  * candidate equi-join keyed by prefix shingle → distinct → verify join
  * carrying the two shingle SETS per surviving candidate. Verification via
  * array_intersect is per-pair O(|A|+|B|) on pre-pruned candidates; for
  * corpora with huge single documents, [[NGramJaccard.verifyPairs]] is the
  * unnest-join alternative with the same semantics.
  */
object PrefixJoin {

  /** All pairs with shingle-set Jaccard ≥ tNum/tDen: (id_a, id_b, jaccard).
    * Docs with empty shingle sets can match nothing and are dropped.
    */
  def jaccardPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleSize: Int = 3,
      tNum: Int = 1,
      tDen: Int = 2): DataFrame = {
    require(tNum > 0 && tDen > 0 && tNum <= tDen,
      s"threshold $tNum/$tDen must be in (0, 1]")
    // three branches read the shingle sets (freq agg, prefix explode,
    // verify) — persist or the tokenize+shingle projection runs per branch
    val sets = df
      .select(col(idCol), TextAnalysis.tokens(col(textCol)).as("_t"))
      .select(col(idCol), NGramJaccard.shingleSetOfTokens(col("_t"), shingleSize).as("_set"))
      .filter(size(col("_set")) > 0)
      .persist()
    val toks = sets.select(col(idCol), explode(col("_set")).as("_sh"))
    val cnt = toks.groupBy("_sh").agg(count(lit(1)).as("_c"))
    // canonical global order: rarest shingle first, ties by value — the
    // struct sort is (freq, shingle) lexicographic in both engines
    val arr = toks.join(cnt, "_sh")
      .groupBy(col(idCol))
      .agg(sort_array(collect_list(struct(col("_c"), col("_sh")))).as("_lst"))
    val n = size(col("_lst"))
    // prefix length p = n - ceil(t*n) + 1, integer-exact
    val p = (n - floor((n * tNum + (tDen - 1)) / lit(tDen)) + 1).cast("int")
    val pre = arr
      .select(col(idCol), explode(slice(col("_lst"), lit(1), p)).as("_s"))
      .select(col(idCol), col("_s._sh").as("_sh"))
    val cand = pre.select(col("_sh"), col(idCol).as("id_a"))
      .join(pre.select(col("_sh"), col(idCol).as("id_b")), Seq("_sh"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .distinct()
    val szs = sets.select(col(idCol), col("_set"), size(col("_set")).as("_n"))
    cand
      .join(szs.select(col(idCol).as("id_a"), col("_set").as("_sa"), col("_n").as("_na")), "id_a")
      .join(szs.select(col(idCol).as("id_b"), col("_set").as("_sb"), col("_n").as("_nb")), "id_b")
      .withColumn("_o", size(array_intersect(col("_sa"), col("_sb"))))
      // integer-exact threshold: o/(na+nb-o) >= tNum/tDen
      .filter(col("_o") * tDen >= (col("_na") + col("_nb") - col("_o")) * tNum)
      .select(col("id_a"), col("id_b"),
        (col("_o").cast("double") /
          (col("_na") + col("_nb") - col("_o")).cast("double")).as("jaccard"))
  }
}
