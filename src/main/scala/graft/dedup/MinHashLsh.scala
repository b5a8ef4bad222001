package graft.dedup

import graft.text.TextAnalysis
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** MinHash + LSH near-duplicate detection:
  * shingle → minhash signature → band → bucket-join.
  *
  * Hash family: for seed i, h_i(shingle) = md5(i || ":" || shingle), compared
  * LEXICOGRAPHICALLY. MinHash only needs a uniform hash with a total order,
  * so the hex string itself serves as the hash value — no integer conversion,
  * and the recipe is reproducible in any engine with md5.
  *
  * Scale shape: signature computation is a pure projection (no shuffle);
  * banding explodes each doc into `bands` rows; the candidate join is a
  * self-equi-join on (band, bucket) — ONE shuffle keyed by bucket, which is
  * exactly the LSH guarantee: only near-duplicates collide, so the join
  * output stays near-linear while a naive all-pairs compare is quadratic.
  */
object MinHashLsh {

  /** Word k-shingles of an already-tokenized array column. The token column
    * is referenced several times (size branches + the slide) — ALWAYS feed
    * this a materialized column (a projected alias), never the raw tokenizer
    * expression: Catalyst inlines a repeated expensive expression into every
    * reference, so `shinglesOfTokens(tokens(c))` would re-run the regexp
    * tokenizer ~5× per row (measured 7× slower on the explode path).
    */
  def shinglesOfTokens(t: Column, k: Int): Column =
    when(size(t) === 0, array().cast("array<string>"))
      .when(size(t) < k, array(array_join(t, " ")))
      .otherwise(
        transform(sequence(lit(1), size(t) - (k - 1)), i =>
          array_join(slice(t, i, lit(k)), " ")))

  /** Word k-shingles of the shared tokenizer's output — convenience form for
    * one-shot expression contexts. Hot paths (anything under an explode or a
    * persist) should pre-project [[TextAnalysis.tokens]] to an alias and call
    * [[shinglesOfTokens]] — see the scaladoc there.
    */
  def shingles(c: Column, k: Int = 3): Column =
    shinglesOfTokens(TextAnalysis.tokens(c), k)

  /** MinHash signature: array of `numHashes` lexicographic-min md5 values. */
  def signature(shinglesCol: Column, numHashes: Int = 12): Column =
    when(size(shinglesCol) === 0, array((0 until numHashes).map(_ => lit(null).cast("string")): _*))
      .otherwise(
        transform(sequence(lit(0), lit(numHashes - 1)), i =>
          array_min(transform(shinglesCol, s => md5(concat(i.cast("string"), lit(":"), s))))))

  /** Band keys: the signature split into `bands` groups of `rowsPerBand`,
    * each group hashed to one bucket key.
    */
  def bandKeys(sigCol: Column, bands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)), b =>
      md5(concat_ws("|", slice(sigCol, b * lit(rowsPerBand) + 1, lit(rowsPerBand)))))

  /** Per-document minhash signature columns `_h0.._hN` via the scalable
    * explode → min-aggregate shape: shingles are computed ONCE per document
    * (the generator argument is evaluated a single time — unlike nesting the
    * shingle expression inside per-seed lambdas, which Spark's interpreted
    * higher-order functions re-evaluate per iteration), then `numHashes`
    * md5 values per shingle row feed a map-side-combined `min` aggregation.
    * One shuffle, tiny payload (N hex strings per doc). Token-less docs have
    * no shingle rows and drop out — they cannot be near-duplicates.
    */
  def signatureTable(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleSize: Int = 3,
      numHashes: Int = 12): DataFrame = {
    // spread shingle hashing across the cluster even when the corpus arrives
    // in few partitions; id-hash partitioning doubles as the groupBy layout
    val parts = df.sparkSession.sessionState.conf.numShufflePartitions
    // tokens materialized behind a projection boundary so the shingle
    // expression's several references hit a cheap attribute, not the regexp
    val exploded = df.repartition(parts, col(idCol))
      .select(col(idCol), TextAnalysis.tokens(col(textCol)).as("_t"))
      .select(col(idCol), explode(shinglesOfTokens(col("_t"), shingleSize)).as("_sh"))
    val aggs = (0 until numHashes).map { i =>
      min(md5(concat(lit(i.toString), lit(":"), col("_sh")))).as(s"_h$i")
    }
    exploded.groupBy(col(idCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** Candidate near-duplicate pairs of `df` by LSH banding.
    *
    * @param idCol    unique document id column name
    * @param textCol  text column name
    * @return (id_a, id_b) distinct pairs with id_a < id_b
    */
  /** The banded LSH index as a TABLE: (id, band, bucket), `bands` rows per
    * document. This is the STORED artifact of the incremental dedup loop —
    * compute it once per corpus snapshot (write it partitioned by bucket
    * hash), append each new batch's rows as they land, and new arrivals
    * probe it via [[candidatePairsAgainst]] without ever re-running the
    * full-corpus self-join.
    */
  def bandedTable(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleSize: Int = 3,
      numHashes: Int = 12,
      bands: Int = 4): DataFrame = {
    require(numHashes % bands == 0, s"numHashes=$numHashes not divisible by bands=$bands")
    val rowsPerBand = numHashes / bands
    val sig = signatureTable(df, idCol, textCol, shingleSize, numHashes)
    val bandCols = (0 until bands).map { b =>
      val slice = (0 until rowsPerBand).map(r => col(s"_h${b * rowsPerBand + r}"))
      md5(concat_ws("|", slice: _*)).as(s"_b$b")
    }
    sig
      .select(col(idCol) +: bandCols: _*)
      .select(col(idCol), posexplode(array((0 until bands).map(b => col(s"_b$b")): _*))
        .as(Seq("band", "bucket")))
  }

  def candidatePairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleSize: Int = 3,
      numHashes: Int = 12,
      bands: Int = 4): DataFrame = {
    // both join branches read the banded table — cache it (4 small rows per
    // doc) or the whole shingle/signature pipeline runs twice. Caches here
    // and in the sibling near-dup operators are MEMORY_AND_DISK and LRU-
    // evictable; a long-lived service should spark.catalog.clearCache()
    // between corpus passes.
    val banded = bandedTable(df, idCol, textCol, shingleSize, numHashes, bands).persist()
    val a = banded.select(col("band"), col("bucket"), col(idCol).as("id_a"))
    val b = banded.select(col("band"), col("bucket"), col(idCol).as("id_b"))
    a.join(b, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .distinct()
  }

  /** Incremental candidate pairs: a NEW batch's banded rows probe the
    * stored corpus index — the daily-ingest shape at 100 TB, where the
    * corpus side is a parquet table that was never recomputed and the
    * shuffle is keyed by (band, bucket) carrying only the new batch plus
    * colliding corpus rows. Emits every candidate pair with ≥ 1 new-side
    * member (prior×prior pairs never form); if `corpusBanded` already
    * contains the new docs' own rows, new×new pairs surface too.
    */
  def candidatePairsAgainst(
      newBanded: DataFrame,
      corpusBanded: DataFrame,
      idCol: String): DataFrame = {
    val n = newBanded.select(col("band"), col("bucket"), col(idCol).as("_nid"))
    val c = corpusBanded.select(col("band"), col("bucket"), col(idCol).as("_cid"))
    n.join(c, Seq("band", "bucket"))
      .filter(col("_nid") =!= col("_cid"))
      .select(
        least(col("_nid"), col("_cid")).as("id_a"),
        greatest(col("_nid"), col("_cid")).as("id_b"))
      .distinct()
  }
}
