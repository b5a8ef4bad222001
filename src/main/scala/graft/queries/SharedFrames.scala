package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared derived tables mined by several gate queries, memoized per
  * (session, dir) through [[Memo]] so each gate measures ITS operator,
  * not the common base's re-derivation (the q81/q82 precedent).
  *
  * `bigramCounts` is the corpus bigram-type table (gram, n) — one
  * token-explode pass over `documents`, localCheckpoint'ed: ~Heaps'-law
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
      graft.text.Vocab.ngramCounts(Tables.load(s, dir, "documents"), "text", 2)
        .localCheckpoint()
    }

  /** Distinct undirected co-occurrence edges (a < b) between words
    * adjacent ≥ 5 times — the q185 graph.
    */
  def bigramEdges(s: SparkSession, dir: String): DataFrame = {
    val sp = split(col("gram"), " ")
    bigramCounts(s, dir)
      .filter(col("n") >= 5)
      .select(least(sp.getItem(0), sp.getItem(1)).as("a"),
        greatest(sp.getItem(0), sp.getItem(1)).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
  }
}
