package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared derived tables mined by several gate queries, memoized per
  * (session, dir) through [[Memo]] so each gate measures ITS operator,
  * not the common base's re-derivation (the q81/q82 precedent).
  *
  * `bigramCounts` is the corpus bigram-type table (gram, n) — one
  * token-explode pass over `documents`, truncated via [[Memo.truncate]]
  * (reliable checkpoint when a checkpoint dir is set): ~Heaps'-law
  * rows, block-manager cached. The co-occurrence EDGE list (q185 k-core,
  * q204 label propagation, q207 BFS, q208 assortativity) and the raw
  * bigram LM counts (q209) are both cheap projections of it.
  */
private[queries] object SharedFrames {

  private val bigramMemo = Memo.slot[DataFrame]()

  /** (gram, n) corpus bigram counts — [[graft.text.Vocab.ngramCounts]]
    * with n = 2, lineage-truncated.
    */
  def bigramCounts(s: SparkSession, dir: String): DataFrame =
    bigramMemo(s, dir) {
      Memo.truncate(
        graft.text.Vocab.ngramCounts(Tables.load(s, dir, "documents"), "text", 2))
    }

  private val basketPairMemo = Memo.slot[DataFrame]()

  /** Per-basket item cap for the co-purchase mining family — ~150× TPC-H's
    * ≤7-part orders (exactness headroom), yet bounding a hot basket key at
    * ~0.5M pairs instead of unbounded quadratic.
    */
  val MaxBasket = 1024

  /** (part_a < part_b, n_ab) co-purchase pair counts over distinct
    * (order, part) baskets — the lineitem self-join that q153
    * (co-purchase top-k), q187 (item Jaccard), q205 (association rules)
    * and q248 (link prediction) all start from; by far the most expensive
    * shared mining step (~2 s at sf0.1), so it runs once per (session,
    * dir) and the gates measure their own operator on top of it.
    * Directional consumers mirror the canonical orientation (n_ab is
    * symmetric).
    *
    * Baskets are capped at [[MaxBasket]] items (rarest-kept,
    * [[graft.operators.MarketBasket.capBaskets]]) before the self-join:
    * the pair explosion is Σ|b|² per basket KEY, so one pathological
    * 10⁵-item basket would otherwise put 10¹⁰ pairs on a single shuffle
    * key. TPC-H orders hold ≤ 7 distinct parts, so at gate scale the cap
    * provably changes nothing (oracle parity holds); at 100× on real
    * retail/web data it bounds the worst key at MaxBasket²/2 pairs.
    */
  def basketPairCounts(s: SparkSession, dir: String): DataFrame =
    basketPairMemo(s, dir) {
      Memo.truncate {
        val op = graft.operators.MarketBasket.capBaskets(
          Tables.load(s, dir, "lineitem").select("l_orderkey", "l_partkey"),
          "l_orderkey", "l_partkey", MaxBasket)
        op.select(col("l_orderkey"), col("l_partkey").as("part_a"))
          .join(op.select(col("l_orderkey"), col("l_partkey").as("part_b")), "l_orderkey")
          .filter(col("part_a") < col("part_b"))
          .groupBy("part_a", "part_b")
          .agg(count(lit(1)).as("n_ab"))
      }
    }

  private val lexRankedMemo = Memo.slot[DataFrame]()

  /** Top-20 lexical more-like-this ranking for anchor docs 0–2
    * ([[graft.text.Retrieval.moreLikeThis]]) — the shared mining step of
    * the retrieval-eval family (q189 fusion, q194 MRR/P@k/AP, q281/q285
    * NDCG, q288 recall@k): each gate measures ITS metric operator on this
    * ranking, not the BM25 re-mine (the basketPairCounts precedent).
    */
  def lexRanked(s: SparkSession, dir: String): DataFrame =
    lexRankedMemo(s, dir) {
      Memo.truncate(
        graft.text.Retrieval.moreLikeThis(
          Tables.load(s, dir, "documents"), "doc_id", "text", Seq(0L, 1L, 2L), k = 20))
    }

  private val bigramEdgeMemo = Memo.slot[DataFrame]()

  /** Distinct undirected co-occurrence edges (a < b) between words
    * adjacent ≥ 5 times — the q185 graph. Memoized IN ITS OWN SLOT on
    * top of [[bigramCounts]]: seven gates (q149 triangles, q185 k-core,
    * q204 LPA, q207 BFS, q208 assortativity, q276 components, q277
    * modularity) start from this exact edge set, and the
    * canonicalize+distinct shuffle is shared mining, not the operator
    * any of them measures — memoizing it also removes a whole stage
    * round-trip per query per run, which is precisely what the
    * stage-heavy iterative family pays for under host contention.
    */
  def bigramEdges(s: SparkSession, dir: String): DataFrame =
    bigramEdgeMemo(s, dir) {
      val sp = split(col("gram"), " ")
      Memo.truncate(
        bigramCounts(s, dir)
          .filter(col("n") >= 5)
          .select(least(sp.getItem(0), sp.getItem(1)).as("a"),
            greatest(sp.getItem(0), sp.getItem(1)).as("b"))
          .filter(col("a") =!= col("b"))
          .distinct())
    }
}
