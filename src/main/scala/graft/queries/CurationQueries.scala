package graft.queries

import graft.Tables
import graft.dedup.Decontaminate
import graft.load.Splits
import graft.operators.{Funnel, Sessionize}
import graft.sim.KMeans
import graft.text.Vocab
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-2 surface: corpus-curation and behavioral-analytics operators —
  * sessionization, funnels, deterministic splits, quota capping, benchmark
  * decontamination, vocabulary/TF-IDF, fuzzy matching, grouping sets,
  * gap-fill, histograms, and the SQL front door. Oracle determinism follows
  * the ParityQueries recipes (decimal-routed double sums, total ORDER BYs,
  * second-precision timestamp strings, md5-derived hashes).
  */
object CurationQueries {

  /** Shared oracle CTE chain: the q31 MinHash-LSH candidate pairs as an
    * undirected edge set, then connected components via a recursive
    * reachability CTE (label = min reachable doc_id). Must be used with
    * `WITH RECURSIVE`.
    */
  /** DuckDB replay of [[graft.sim.KMeans.fit]] + final assignment, unrolled
    * to `iters` Lloyd iterations (k-means is deterministic here — lowest-id
    * init, tie-to-lowest argmin, exact means — so the oracle retrains from
    * scratch and must reach the same per-vector assignment). Distance uses
    * the identical `c·c − 2·x·c` form and both engines fold the dot
    * products sequentially in index order.
    */
  /** The WITH-clause body shared by every oracle that replays the k-means
    * fit: `cents0 … fin`, where `fin(vec_id, cid)` is the final assignment.
    */
  private def kmeansCtes(k: Int, iters: Int, dims: Int): String = {
    def dist(emb: String, c: String): String =
      s"(list_aggregate(list_transform(generate_series(1, $dims), i -> $c[i]*$c[i]), 'sum')" +
        s" - 2 * list_aggregate(list_transform(generate_series(1, $dims)," +
        s" i -> $emb[i]::DOUBLE * $c[i]), 'sum'))"
    def assignCte(name: String, cents: String): String =
      s"""$name AS (
         |  SELECT vec_id, cid FROM (
         |    SELECT e.vec_id, c.cid,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY ${dist("e.embedding", "c.c")}, c.cid) AS rn
         |    FROM embeddings e CROSS JOIN $cents c) WHERE rn = 1)""".stripMargin
    val init =
      s"""cents0 AS (
         |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid,
         |         list_transform(embedding, v -> v::DOUBLE) AS c
         |  FROM (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT $k))""".stripMargin
    val rounds = (1 to iters).map { t =>
      s"""${assignCte(s"assign$t", s"cents${t - 1}")},
         |means$t AS (
         |  SELECT a.cid, i, avg(e.embedding[i]::DOUBLE) AS m
         |  FROM assign$t a JOIN embeddings e USING (vec_id),
         |       unnest(generate_series(1, $dims)) AS u(i)
         |  GROUP BY a.cid, i),
         |cents$t AS (
         |  SELECT p.cid, coalesce(m.c, p.c) AS c
         |  FROM cents${t - 1} p LEFT JOIN
         |    (SELECT cid, list(m ORDER BY i) AS c FROM means$t GROUP BY cid) m
         |    ON p.cid = m.cid)""".stripMargin
    }
    (Seq(init) ++ rounds ++ Seq(assignCte("fin", s"cents$iters"))).mkString(",\n")
  }

  private def kmeansUnrolledOracle(k: Int, iters: Int, dims: Int): String =
    s"WITH ${kmeansCtes(k, iters, dims)}\n" +
      """SELECT vec_id, CAST(cid AS BIGINT) AS cluster,
        |  count(*) OVER (PARTITION BY cid) AS cluster_n
        |FROM fin ORDER BY vec_id""".stripMargin

  /** SemDeDup oracle: the k-means replay above, then within-cluster cosine
    * pairs at ≥ `tau` (6-dp rounded, the q34 convention) mark every
    * higher-id member of a pair dropped; the rest are kept.
    */
  private def semDedupOracle(k: Int, iters: Int, dims: Int, tau: Double): String =
    s"WITH ${kmeansCtes(k, iters, dims)},\n" +
      s"""n AS (
         |  SELECT f.vec_id, f.cid, e.embedding,
         |    sqrt(list_aggregate(list_transform(generate_series(1, $dims),
         |      i -> e.embedding[i]::DOUBLE * e.embedding[i]::DOUBLE), 'sum')) AS nrm
         |  FROM fin f JOIN embeddings e USING (vec_id)),
         |p AS (
         |  SELECT a.vec_id AS ida, b.vec_id AS idb,
         |    round(list_aggregate(list_transform(generate_series(1, $dims),
         |      i -> a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE), 'sum')
         |      / (a.nrm * b.nrm), 6) AS cs
         |  FROM n a JOIN n b ON a.cid = b.cid AND a.vec_id < b.vec_id),
         |d AS (SELECT DISTINCT idb FROM p WHERE cs >= $tau)
         |SELECT n.vec_id, CAST(n.cid AS BIGINT) AS cluster, (d.idb IS NULL) AS kept
         |FROM n LEFT JOIN d ON n.vec_id = d.idb ORDER BY vec_id""".stripMargin

  /** Simplified-silhouette oracle: replay the k-means fit, then per vector
    * the full `x·x − 2·x·c + c·c` distance to every FINAL centroid (all
    * three index-order double folds, fp-cancellation clamped at 0 — the
    * [[graft.sim.KMeans.simplifiedSilhouette]] recipe), nearest/second-
    * nearest by (d², cid), and `sil = (b − a)/max(a, b)` rounded 6 dp.
    */
  private def silhouetteOracle(k: Int, iters: Int, dims: Int): String =
    s"WITH ${kmeansCtes(k, iters, dims)},\n" +
      s"""x AS (SELECT vec_id, list_transform(embedding, v -> v::DOUBLE) AS xv
         |      FROM embeddings),
         |xs AS (SELECT vec_id, xv,
         |    list_aggregate(list_transform(generate_series(1, $dims),
         |      i -> xv[i] * xv[i]), 'sum') AS xx
         |  FROM x),
         |dd AS (SELECT xs.vec_id, c.cid,
         |    greatest(xs.xx
         |      - 2 * list_aggregate(list_transform(generate_series(1, $dims),
         |          i -> xs.xv[i] * c.c[i]), 'sum')
         |      + list_aggregate(list_transform(generate_series(1, $dims),
         |          i -> c.c[i] * c.c[i]), 'sum'), 0) AS d2
         |  FROM xs CROSS JOIN cents$iters c),
         |r AS (SELECT vec_id, cid, d2,
         |    row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
         |  FROM dd),
         |ab AS (SELECT a.vec_id, a.cid AS cluster, a.d2 AS a2, b.d2 AS b2
         |       FROM r a JOIN r b
         |         ON a.vec_id = b.vec_id AND a.rn = 1 AND b.rn = 2)
         |SELECT vec_id, CAST(cluster AS BIGINT) AS cluster,
         |  CASE WHEN greatest(sqrt(a2), sqrt(b2)) = 0 THEN 0.0
         |    ELSE round((sqrt(b2) - sqrt(a2)) / greatest(sqrt(a2), sqrt(b2)), 6)
         |  END AS sil
         |FROM ab ORDER BY vec_id""".stripMargin

  /** q81 and q82 mine the SAME MinHash-LSH pair graph and cluster it the
    * same way; computing it inside each gate measured re-mining, not
    * clustering. Shared per (session, dir) via [[Memo]] (see its scaladoc
    * for the lifecycle contract): [[graft.dedup.DupClusters.components]]
    * already returns a localCheckpoint'ed (lineage-truncated, block-manager
    * cached) frame, so the memoized handle survives the bench harness's
    * per-query `spark.catalog.clearCache()` (which clears only the SQL cache)
    * and the second consumer pays a cache read, not a re-mine.
    */
  private val componentsMemo = Memo.slot[DataFrame]()
  private val corpusRunMemo = Memo.slot[(DataFrame, DataFrame)]()

  /** Drop every memoized handle bound to `s` (all slots, all query
    * modules) — called automatically when its SparkContext ends; call it
    * directly when retiring one session of several sharing a context.
    */
  def evictMemos(s: SparkSession): Unit = Memo.evict(s)

  private[graft] def minhashComponents(s: SparkSession, dir: String): DataFrame =
    componentsMemo(s, dir) {
      val pairs = graft.dedup.MinHashLsh.candidatePairs(
        Tables.load(s, dir, "documents"), "doc_id", "text",
        shingleSize = 3, numHashes = 12, bands = 4)
      graft.dedup.DupClusters.components(pairs, "id_a", "id_b")
    }

  /** q110/q111 share ONE end-to-end [[graft.pipeline.CorpusPipeline]] run
    * per (session, dir): the pipeline writes a corpus snapshot + audit
    * counts in a single pass, and the two gates read different facets of
    * that run (kept rows vs audit counts). Fresh temp dirs per run keep the
    * result deterministic — no prior corpus, no catalog carry-over; the
    * dirs are registered for recursive deletion at JVM exit (they can't be
    * deleted at eviction time in general — an evicted-but-collected
    * DataFrame read from them may still be in flight elsewhere).
    */
  private val tempDirs = new java.util.concurrent.ConcurrentLinkedQueue[String]
  locally {
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      tempDirs.forEach { d =>
        try {
          import scala.jdk.CollectionConverters._
          java.nio.file.Files.walk(java.nio.file.Paths.get(d)).iterator().asScala
            .toSeq.reverse.foreach(p => java.nio.file.Files.deleteIfExists(p))
        } catch { case _: Throwable => () }
      }
    }, "graft-tempdir-cleanup"))
  }

  private def corpusRun(s: SparkSession, dir: String): (DataFrame, DataFrame) =
    corpusRunMemo(s, dir) {
      val tmp = java.nio.file.Files.createTempDirectory("graft_q110_").toString
      tempDirs.add(tmp)
      val docs = Tables.load(s, dir, "documents")
      val pipe = new graft.pipeline.CorpusPipeline(
        s,
        new graft.catalog.Catalog(s, s"$tmp/catalog"),
        s"$tmp/corpus",
        minQualityTokens = 5,
        nearDupJaccard = 0.8,
        benchmark = Some(docs.filter(pmod(col("doc_id"), lit(97)) === 3)))
      val res = pipe.processBatch(
        docs.filter(pmod(col("doc_id"), lit(97)) =!= 3), "gate_batch")
      val kept = graft.load.Snapshot.readTable(s, s"$tmp/corpus")
        .select(col("doc_id"), col("split"))
        .orderBy("doc_id")
      import s.implicits._
      val audit = Seq(
        (res.ingested, res.exactDups, res.nearDups, res.rejected, res.contaminated))
        .toDF("ingested", "exact_dups", "near_dups", "rejected", "contaminated")
      (kept, audit)
    }

  /** DuckDB replay of that corpus-pipeline run: quality gate → first-wins
    * exact dedup → LSH candidates → Jaccard-verified edges → connected
    * components (canonical survivor per cluster) → benchmark 4-shingle
    * decontamination. Shared by the q110 (kept rows) and q111 (audit
    * counts) oracles.
    */
  private val CorpusPipelineCtes =
    """ann AS (SELECT doc_id, text, md5(text) AS text_hash,
      |    len(list_filter(regexp_extract_all(lower(text), '[a-z0-9]+'), x -> x != '')) AS n_tokens
      |  FROM documents WHERE doc_id % 97 != 3),
      |qual AS (SELECT doc_id, text, text_hash FROM ann WHERE n_tokens >= 5),
      |fw AS (SELECT doc_id, text FROM (
      |    SELECT doc_id, text, row_number() OVER (PARTITION BY text_hash ORDER BY doc_id) AS rn
      |    FROM qual) WHERE rn = 1),
      |tok AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t FROM fw),
      |sh3 AS (SELECT doc_id,
      |  CASE WHEN len(t) = 0 THEN CAST([] AS VARCHAR[])
      |       WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
      |       ELSE list_transform(generate_series(1, len(t) - 2),
      |            i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
      |  END AS s FROM tok),
      |sig AS (SELECT doc_id,
      |  list_transform(generate_series(0, 11), i ->
      |    list_aggregate(list_transform(s, sh2 -> md5(i::VARCHAR || ':' || sh2)), 'min')) AS g
      |  FROM sh3 WHERE len(s) > 0),
      |band AS (SELECT doc_id, u.b AS band,
      |    md5(array_to_string(g[u.b*3+1 : u.b*3+3], '|')) AS bucket
      |  FROM sig, unnest(generate_series(0, 3)) AS u(b)),
      |prs AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      |  FROM band a JOIN band b ON a.band = b.band AND a.bucket = b.bucket
      |    AND a.doc_id < b.doc_id),
      |st AS (SELECT doc_id, list_distinct(s) AS ds FROM sh3),
      |ver AS (SELECT id_a, id_b FROM prs
      |  JOIN st x ON x.doc_id = prs.id_a JOIN st y ON y.doc_id = prs.id_b
      |  WHERE len(list_intersect(x.ds, y.ds)) * 1.0
      |      / (len(x.ds) + len(y.ds) - len(list_intersect(x.ds, y.ds))) >= 0.8),
      |edges AS (SELECT id_a AS src, id_b AS dst FROM ver UNION SELECT id_b, id_a FROM ver),
      |reach(node, label) AS (
      |  SELECT src, src FROM edges
      |  UNION
      |  SELECT e.src, r.label FROM edges e JOIN reach r ON e.dst = r.node),
      |comp AS (SELECT node, min(label) AS component FROM reach GROUP BY node),
      |ded AS (SELECT doc_id, text FROM fw
      |  WHERE doc_id NOT IN (SELECT node FROM comp WHERE node != component)),
      |dtok AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t FROM ded),
      |dsh4 AS (SELECT doc_id,
      |  CASE WHEN len(t) = 0 THEN CAST([] AS VARCHAR[])
      |       WHEN len(t) < 4 THEN [array_to_string(t, ' ')]
      |       ELSE list_transform(generate_series(1, len(t) - 3),
      |            i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3])
      |  END AS s FROM dtok),
      |btok AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t
      |  FROM documents WHERE doc_id % 97 = 3),
      |bsh4 AS (SELECT doc_id,
      |  CASE WHEN len(t) = 0 THEN CAST([] AS VARCHAR[])
      |       WHEN len(t) < 4 THEN [array_to_string(t, ' ')]
      |       ELSE list_transform(generate_series(1, len(t) - 3),
      |            i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3])
      |  END AS s FROM btok),
      |bench AS (SELECT DISTINCT u.g FROM bsh4, unnest(s) AS u(g)),
      |contam AS (SELECT DISTINCT doc_id FROM dsh4, unnest(s) AS u(g)
      |  WHERE u.g IN (SELECT g FROM bench)),
      |kept AS (SELECT doc_id FROM ded
      |  WHERE doc_id NOT IN (SELECT doc_id FROM contam))""".stripMargin

  private[queries] val MinhashComponentCtes =
    """tok AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t FROM documents),
      |sh3 AS (SELECT doc_id,
      |  CASE WHEN len(t) = 0 THEN CAST([] AS VARCHAR[])
      |       WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
      |       ELSE list_transform(generate_series(1, len(t) - 2),
      |            i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
      |  END AS s FROM tok),
      |sig AS (SELECT doc_id,
      |  list_transform(generate_series(0, 11), i ->
      |    list_aggregate(list_transform(s, sh2 -> md5(i::VARCHAR || ':' || sh2)), 'min')) AS g
      |  FROM sh3 WHERE len(s) > 0),
      |band AS (SELECT doc_id, u.b AS band,
      |    md5(array_to_string(g[u.b*3+1 : u.b*3+3], '|')) AS bucket
      |  FROM sig, unnest(generate_series(0, 3)) AS u(b)),
      |prs AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      |  FROM band a JOIN band b ON a.band = b.band AND a.bucket = b.bucket
      |    AND a.doc_id < b.doc_id),
      |edges AS (SELECT id_a AS src, id_b AS dst FROM prs UNION SELECT id_b, id_a FROM prs),
      |reach(node, label) AS (
      |  SELECT src, src FROM edges
      |  UNION
      |  SELECT e.src, r.label FROM edges e JOIN reach r ON e.dst = r.node),
      |comp AS (SELECT node, min(label) AS component FROM reach GROUP BY node)""".stripMargin

  /** Shared oracle CTEs: tokenized documents + word 4-shingles (matches
    * MinHashLsh.shingles(k = 4)).
    */
  private val Tok4Cte =
    """tok AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t FROM documents),
      |sh AS (SELECT doc_id,
      |  CASE WHEN len(t) = 0 THEN CAST([] AS VARCHAR[])
      |       WHEN len(t) < 4 THEN [array_to_string(t, ' ')]
      |       ELSE list_transform(generate_series(1, len(t) - 3),
      |            i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3])
      |  END AS s FROM tok)""".stripMargin

  /** A gate query whose ONE SQL text runs verbatim in both engines (dialect
    * intersection): registered table views on the Spark side, the same
    * string as the DuckDB oracle — no drift between the two copies.
    */
  private def sqlBoth(name: String, tables: Seq[String], sql: String): Q =
    Q(name, sql) { (s, dir) =>
      tables.foreach(t => Tables.load(s, dir, t).createOrReplaceTempView(t))
      s.sql(sql)
    }

  val all: Seq[Q] = Seq(

    // Inactivity-gap sessionization (30 min), per-session stats. One shuffle
    // on user_id shared by the lag window, the running sum, and the session
    // aggregate.
    Q(
      "q63_sessionize",
      """WITH x AS (SELECT user_id, event_id, ts,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000 THEN 1 ELSE 0 END AS ns
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (SELECT user_id, event_id, ts,
        |    CAST(sum(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id FROM x)
        |SELECT user_id, session_id, count(*) AS n_events,
        |  strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
        |  epoch_us(max(ts)) - epoch_us(min(ts)) AS duration_us
        |FROM s GROUP BY user_id, session_id ORDER BY user_id, session_id""".stripMargin) {
      (s, dir) =>
        Sessionize.sessionStats(Tables.events(s, dir), "user_id", "ts", "event_id", 1800L)
          .orderBy("user_id", "session_id")
    },

    // Ordered-step funnel: step k counts only at-or-after the key's step k-1
    // time (min-time semantics).
    Q(
      "q64_funnel",
      """WITH t1 AS (SELECT user_id, min(ts) AS t FROM events
        |            WHERE event_type = 'view' GROUP BY user_id),
        |t2 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
        |       JOIN t1 ON e.user_id = t1.user_id AND e.ts >= t1.t
        |       WHERE e.event_type = 'click' GROUP BY e.user_id),
        |t3 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
        |       JOIN t2 ON e.user_id = t2.user_id AND e.ts >= t2.t
        |       WHERE e.event_type = 'purchase' GROUP BY e.user_id)
        |SELECT * FROM (
        |  SELECT CAST(1 AS BIGINT) AS pos, 'view' AS step, count(*) AS n_keys FROM t1
        |  UNION ALL SELECT 2, 'click', count(*) FROM t2
        |  UNION ALL SELECT 3, 'purchase', count(*) FROM t3) ORDER BY pos""".stripMargin) {
      (s, dir) =>
        Funnel.completionCounts(
          Tables.events(s, dir), "user_id", "ts", "event_type",
          Seq("view", "click", "purchase"))
    },

    // Deterministic hash split (80/10/10): pure function of the row key —
    // same row, same split, any engine, any partitioning. No shuffle.
    Q(
      "q65_hash_split",
      """SELECT CASE WHEN b < 8 THEN 'train' WHEN b = 8 THEN 'val' ELSE 'test' END AS split,
        |  count(*) AS n
        |FROM (SELECT CAST(('0x' || substr(md5(doc_id::VARCHAR), 1, 6)) AS BIGINT) % 10 AS b
        |      FROM documents)
        |GROUP BY split ORDER BY split""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "documents")
        .select(Splits.assignSplit(col("doc_id"), Seq("train" -> 8, "val" -> 1, "test" -> 1))
          .as("split"))
        .groupBy("split")
        .agg(count(lit(1)).as("n"))
        .orderBy("split")
    },

    // Per-key quota capping: top 20 docs per language, best-first — Spark 4's
    // WindowGroupLimit turns the rank filter into a per-partition top-k
    // before the exchange.
    Q(
      "q66_domain_quota",
      """SELECT lang, doc_id, n_chars FROM (
        |  SELECT lang, doc_id, n_chars,
        |    row_number() OVER (PARTITION BY lang ORDER BY n_chars DESC, doc_id) AS rk
        |  FROM documents) WHERE rk <= 20 ORDER BY lang, doc_id""".stripMargin) { (s, dir) =>
      Splits.quotaPerKey(
        Tables.load(s, dir, "documents"), "lang",
        Seq(col("n_chars").desc, col("doc_id")), 20)
        .select("lang", "doc_id", "n_chars")
        .orderBy("lang", "doc_id")
    },

    // Benchmark decontamination: corpus docs sharing a word 4-shingle with
    // the (deterministic) benchmark subset. Benchmark shingles broadcast;
    // the corpus is never shuffled.
    Q(
      "q67_decontaminate",
      s"""WITH $Tok4Cte,
         |bench AS (SELECT DISTINCT u.g FROM sh, unnest(s) AS u(g) WHERE doc_id % 97 = 3)
         |SELECT DISTINCT doc_id FROM sh, unnest(s) AS u(g)
         |WHERE doc_id % 97 != 3 AND u.g IN (SELECT g FROM bench)
         |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
      Decontaminate.contaminatedIds(
        docs.filter(pmod(col("doc_id"), lit(97)) =!= 3), "doc_id", "text",
        docs.filter(pmod(col("doc_id"), lit(97)) === 3), "text", k = 4)
        .orderBy("doc_id")
    },

    // Vocabulary top-k: the wordcount shape — map-side combine means the
    // shuffle carries (term, partial count), not token occurrences.
    Q(
      "q68_vocab_topk",
      """SELECT u.tok AS token, count(*) AS tf
        |FROM (SELECT regexp_extract_all(lower(text), '[a-z0-9]+') AS t FROM documents),
        |  unnest(t) AS u(tok)
        |GROUP BY token ORDER BY tf DESC, token LIMIT 100""".stripMargin) { (s, dir) =>
      Vocab.termFrequencies(Tables.load(s, dir, "documents"), "text")
        .orderBy(col("tf").desc, col("token"))
        .limit(100)
    },

    // Rational-IDF term weighting tf*(N+1)/(df+1): log-free, so scores are
    // bit-reproducible across engines. (Deliberately NOT classical log
    // TF-IDF — the combined score ranks differently; Vocab.tfIdfLog has the
    // classical metric, which libm differences keep out of the oracle gate.)
    Q(
      "q69_tfidf",
      """WITH tt AS (SELECT doc_id, u.tok AS token
        |  FROM (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t FROM documents),
        |    unnest(t) AS u(tok)),
        |agg AS (SELECT token, count(*) AS tf, count(DISTINCT doc_id) AS df FROM tt GROUP BY token),
        |n AS (SELECT count(*) AS nd FROM documents)
        |SELECT token, tf, df, round(tf * (nd + 1.0) / (df + 1.0), 4) AS score
        |FROM agg, n ORDER BY score DESC, token LIMIT 100""".stripMargin) { (s, dir) =>
      Vocab.tfIdf(Tables.load(s, dir, "documents"), "doc_id", "text")
        .orderBy(col("score").desc, col("token"))
        .limit(100)
    },

    // Fuzzy pair matching via pigeonhole segment blocking (FuzzyJoin): a
    // 1-edit pair shares the 16-char prefix or the 2-char end-suffix, so
    // candidates come from equi-joins, not the nation-wide cross product —
    // the oracle brute-forces the quadratic definition it can afford at
    // oracle scale.
    Q(
      "q70_fuzzy_pairs",
      """SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
        |  CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS dist
        |FROM customer a JOIN customer b
        |  ON a.c_nationkey = b.c_nationkey AND a.c_custkey < b.c_custkey
        |WHERE levenshtein(a.c_name, b.c_name) <= 1
        |ORDER BY id_a, id_b""".stripMargin) { (s, dir) =>
      graft.operators.FuzzyJoin.pairsWithinOne(
        Tables.load(s, dir, "customer").select("c_custkey", "c_name", "c_nationkey"),
        "c_custkey", "c_name", Seq("c_nationkey"),
        prefixLen = 16, suffixLen = 2)
        .orderBy("id_a", "id_b")
    },

    // Explicit GROUPING SETS with grouping flags (rollup/cube's general
    // form; q44/q57 cover those). SQL-only surface → spark.sql.
    Q(
      "q71_grouping_sets",
      """SELECT o_orderstatus AS status, o_orderpriority AS prio,
        |  CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
        |  CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_prio, count(*) AS n
        |FROM orders GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY g_status, g_prio, status NULLS FIRST, prio NULLS FIRST""".stripMargin) {
      (s, dir) =>
        Tables.load(s, dir, "orders").createOrReplaceTempView("orders")
        s.sql(
          """SELECT o_orderstatus AS status, o_orderpriority AS prio,
            |  CAST(grouping(o_orderstatus) AS BIGINT) AS g_status,
            |  CAST(grouping(o_orderpriority) AS BIGINT) AS g_prio, count(*) AS n
            |FROM orders GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
            |ORDER BY g_status, g_prio, status NULLS FIRST, prio NULLS FIRST""".stripMargin)
    },

    // Gap-fill / forward-fill: carry the last purchase value forward within
    // each user's timeline (last_value IGNORE NULLS — the time-series
    // imputation primitive). Values are raw parquet doubles: no arithmetic,
    // no rounding needed.
    Q(
      "q72_forward_fill",
      """WITH b AS (SELECT user_id, event_id, ts,
        |    CASE WHEN event_type = 'purchase' THEN value END AS pv FROM events)
        |SELECT user_id, event_id,
        |  last_value(pv IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                                    ROWS UNBOUNDED PRECEDING) AS filled
        |FROM b ORDER BY user_id, event_id""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, dir)
        .withColumn("pv", when(col("event_type") === "purchase", col("value")))
        .select(
          col("user_id"), col("event_id"),
          last(col("pv"), ignoreNulls = true).over(w).as("filled"))
        .orderBy("user_id", "event_id")
    },

    // Linear interpolation of interior nulls (the gap-repair step past
    // q72's forward fill): straight line between nearest observations,
    // weighted by x-distance; edge nulls stay null. Rounding is the
    // explicit floor(x·10⁶ + 0.5)/10⁶ form on BOTH sides — engine round()
    // implementations differ on tie boundaries (Spark rounds the exact
    // decimal HALF_UP, DuckDB rounds through x·10⁶ double arithmetic; at
    // sf0.1 two rows landed a last-ulp apart), while the floor form is a
    // fixed sequence of correctly-rounded IEEE ops → bit-identical.
    Q(
      "q108_interpolate",
      """WITH b AS (SELECT user_id, event_id,
        |    CASE WHEN event_type = 'purchase' THEN value END AS pv FROM events),
        |w AS (SELECT user_id, event_id, pv,
        |  last_value(pv IGNORE NULLS) OVER
        |    (PARTITION BY user_id ORDER BY event_id ROWS UNBOUNDED PRECEDING) AS prev_v,
        |  last_value(CASE WHEN pv IS NOT NULL THEN event_id END IGNORE NULLS) OVER
        |    (PARTITION BY user_id ORDER BY event_id ROWS UNBOUNDED PRECEDING) AS prev_x,
        |  first_value(pv IGNORE NULLS) OVER
        |    (PARTITION BY user_id ORDER BY event_id
        |     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_v,
        |  first_value(CASE WHEN pv IS NOT NULL THEN event_id END IGNORE NULLS) OVER
        |    (PARTITION BY user_id ORDER BY event_id
        |     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_x
        | FROM b)
        |SELECT user_id, event_id,
        |  floor((CASE WHEN pv IS NOT NULL THEN pv
        |    WHEN prev_v IS NOT NULL AND next_v IS NOT NULL THEN
        |      prev_v + (next_v - prev_v) * (event_id - prev_x) / (next_x - prev_x)
        |  END) * 1000000.0 + 0.5) / 1000000.0 AS y
        |FROM w ORDER BY user_id, event_id""".stripMargin) { (s, dir) =>
      val ev = Tables.events(s, dir)
        .withColumn("pv", when(col("event_type") === "purchase", col("value")))
        .select("user_id", "event_id", "pv")
      graft.operators.TimeSeries
        .interpolateLinear(ev, Seq("user_id"), "event_id", "pv", "y")
        .select(col("user_id"), col("event_id"),
          (floor(col("y") * lit(1000000.0) + lit(0.5)).cast("double") /
            lit(1000000.0)).as("y"))
        .orderBy("user_id", "event_id")
    },

    // Robust per-group outlier stats: median + MAD flag heavy-tail values
    // a mean/stddev pair would be dragged by. Exact interpolated
    // percentiles (the q54 recipe) keep both engines in lockstep.
    Q(
      "q109_mad_outliers",
      """WITH m AS (SELECT event_type, median(value) AS med FROM events GROUP BY 1),
        |d AS (SELECT e.event_type AS event_type, m.med AS med,
        |        median(abs(e.value - m.med)) AS mad
        |      FROM events e JOIN m ON e.event_type = m.event_type
        |      GROUP BY e.event_type, m.med)
        |SELECT d.event_type, round(d.med, 4) AS median, round(d.mad, 4) AS mad,
        |  CAST(sum(CASE WHEN abs(e.value - d.med) > 3 * d.mad THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_outliers
        |FROM events e JOIN d ON e.event_type = d.event_type
        |GROUP BY d.event_type, d.med, d.mad ORDER BY d.event_type""".stripMargin) { (s, dir) =>
      graft.operators.RobustStats
        .madOutlierStats(Tables.events(s, dir), Seq("event_type"), "value", k = 3.0)
        .select(
          col("event_type"),
          round(col("median"), 4).as("median"),
          round(col("mad"), 4).as("mad"),
          col("n_outliers"))
        .orderBy("event_type")
    },

    // Fixed-width histogram (decimal-routed totals per bucket).
    Q(
      "q73_histogram",
      """SELECT CAST(floor(l_extendedprice / 5000) AS BIGINT) AS bucket, count(*) AS n,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM lineitem GROUP BY bucket ORDER BY bucket""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "lineitem")
        .groupBy(floor(col("l_extendedprice") / 5000).cast("long").as("bucket"))
        .agg(
          count(lit(1)).as("n"),
          sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("total"))
        .orderBy("bucket")
    },

    // SQL front door: TPC-H Q3 shape (segment dim filter → join → decimal
    // revenue rollup → top-k) submitted as SQL text over registered views —
    // the same Catalyst plan the DataFrame API would build.
    Q(
      "q74_sql_topk_revenue",
      """SELECT o_orderkey,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |      * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        |  strftime(o_orderdate, '%Y-%m-%d') AS orderdate
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |  JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '1998-01-01'
        |  AND l_shipdate > TIMESTAMP '1998-01-01'
        |GROUP BY o_orderkey, o_orderdate
        |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "customer").createOrReplaceTempView("customer")
      Tables.load(s, dir, "orders").createOrReplaceTempView("orders")
      Tables.load(s, dir, "lineitem").createOrReplaceTempView("lineitem")
      s.sql(
        """SELECT o_orderkey,
          |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
          |      * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
          |  date_format(o_orderdate, 'yyyy-MM-dd') AS orderdate
          |FROM customer JOIN orders ON c_custkey = o_custkey
          |  JOIN lineitem ON l_orderkey = o_orderkey
          |WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '1998-01-01'
          |  AND l_shipdate > TIMESTAMP '1998-01-01'
          |GROUP BY o_orderkey, o_orderdate
          |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin)
    },

    // Deterministic mode per group: most frequent value, ties to the
    // lexicographically smallest (built-in `mode` is tie-nondeterministic —
    // this shape is portable).
    Q(
      "q75_mode_per_key",
      """WITH c AS (SELECT user_id, event_type, count(*) AS n FROM events GROUP BY 1, 2)
        |SELECT user_id, event_type AS mode_type, n FROM (
        |  SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY n DESC, event_type) AS rk
        |  FROM c) WHERE rk = 1 ORDER BY user_id""".stripMargin) { (s, dir) =>
      val counts = Tables.events(s, dir)
        .groupBy("user_id", "event_type")
        .agg(count(lit(1)).as("n"))
      val w = Window.partitionBy(col("user_id")).orderBy(col("n").desc, col("event_type"))
      counts.withColumn("rk", row_number().over(w))
        .filter(col("rk") === 1)
        .select(col("user_id"), col("event_type").as("mode_type"), col("n"))
        .orderBy("user_id")
    },

    // Weighted average (quantity-weighted price): both sums decimal-exact,
    // one double division at the end — associative, salt/AQE-safe.
    Q(
      "q76_weighted_avg",
      """SELECT l_returnflag AS flag,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
        |  / CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS wavg_price
        |FROM lineitem GROUP BY flag ORDER BY flag""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "lineitem")
        .groupBy(col("l_returnflag").as("flag"))
        .agg((sum(col("l_extendedprice").cast("decimal(18,2)")
            * col("l_quantity").cast("decimal(18,2)")).cast("double")
          / sum(col("l_quantity").cast("decimal(18,2)")).cast("double")).as("wavg_price"))
        .orderBy("flag")
    },

    // Latest-wins upsert (MERGE without a table format): updated keys keep
    // the update row, ties prefer updates; one window shuffle.
    Q(
      "q78_upsert",
      """WITH upd AS (SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus, o_totalprice,
        |    o_orderdate + INTERVAL 1 DAY AS o_orderdate, o_orderpriority
        |  FROM orders WHERE o_orderkey % 10 = 3),
        |all_rows AS (SELECT *, 0 AS src FROM orders UNION ALL SELECT *, 1 AS src FROM upd),
        |r AS (SELECT *, row_number() OVER (PARTITION BY o_orderkey
        |        ORDER BY o_orderdate DESC, src DESC) AS rk FROM all_rows)
        |SELECT o_orderkey, o_orderstatus,
        |  strftime(o_orderdate, '%Y-%m-%d') AS orderdate
        |FROM r WHERE rk = 1 ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
      val orders = Tables.load(s, dir, "orders")
      val updates = orders
        .filter(pmod(col("o_orderkey"), lit(10)) === 3)
        .withColumn("o_orderstatus", lit("U"))
        .withColumn("o_orderdate", col("o_orderdate") + expr("INTERVAL 1 DAY"))
      graft.load.Snapshot.upsertLatestWins(orders, updates, Seq("o_orderkey"), "o_orderdate")
        .select(
          col("o_orderkey"), col("o_orderstatus"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("orderdate"))
        .orderBy("o_orderkey")
    },

    // Salted join: the hot-key fan-out shape (row-identical to the plain
    // join, which is what the oracle runs).
    Q(
      "q79_salted_join",
      """SELECT o_orderstatus AS status,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty, count(*) AS n
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY status ORDER BY status""".stripMargin) { (s, dir) =>
      graft.load.Skew.saltedJoin(
        Tables.load(s, dir, "lineitem").select(col("l_orderkey").as("k"), col("l_quantity")),
        Tables.load(s, dir, "orders").select(col("o_orderkey").as("k"), col("o_orderstatus")),
        Seq("k"), saltBuckets = 4)
        .groupBy(col("o_orderstatus").as("status"))
        .agg(
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("qty"),
          count(lit(1)).as("n"))
        .orderBy("status")
    },

    // The NATIVE as-of merge operator (custom LogicalPlan → Strategy →
    // SparkPlan, graft.plans.AsOfJoinExec) against DuckDB's native ASOF
    // JOIN — q51 gates the union+window formulation of the same semantics.
    Q(
      "q80_asof_native",
      """WITH c AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
        |p AS (SELECT user_id, ts AS pts FROM events WHERE event_type = 'purchase')
        |SELECT c.event_id, c.user_id,
        |  strftime(date_trunc('second', c.ts), '%Y-%m-%d %H:%M:%S') AS click_ts,
        |  strftime(date_trunc('second', p.pts), '%Y-%m-%d %H:%M:%S') AS last_purchase_ts
        |FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND c.ts >= p.pts
        |ORDER BY event_id""".stripMargin) { (s, dir) =>
      val ev = Tables.events(s, dir)
      val clicks = ev.filter(col("event_type") === "click").select("event_id", "user_id", "ts")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts").as("pts"))
      graft.operators.AsOfJoin
        .lastPriorMatchNative(clicks, purchases, Seq("user_id"), "ts", "pts", Seq("pts"))
        .select(
          col("event_id"),
          col("user_id"),
          date_format(date_trunc("second", col("ts")), "yyyy-MM-dd HH:mm:ss").as("click_ts"),
          date_format(date_trunc("second", col("asof_pts")), "yyyy-MM-dd HH:mm:ss")
            .as("last_purchase_ts"))
        .orderBy("event_id")
    },

    // Near-dup clustering: connected components (iterative min-label
    // propagation) over the MinHash-LSH candidate-pair graph — pairs only
    // say "a ~ b"; deduplication needs the transitive closure. Oracle:
    // recursive reachability CTE.
    Q(
      "q81_dup_clusters",
      s"""WITH RECURSIVE $MinhashComponentCtes
         |SELECT node AS doc_id, component FROM comp ORDER BY doc_id""".stripMargin) {
      (s, dir) =>
        minhashComponents(s, dir)
          .select(col("node").as("doc_id"), col("component"))
          .orderBy("doc_id")
    },

    // Keep-one-per-cluster: the corpus after dropping every non-canonical
    // cluster member (the end state of the dedup pipeline), rolled up by
    // language.
    Q(
      "q82_dedup_canonical",
      s"""WITH RECURSIVE $MinhashComponentCtes,
         |losers AS (SELECT node FROM comp WHERE node != component)
         |SELECT lang, count(*) AS n_docs FROM documents
         |WHERE doc_id NOT IN (SELECT node FROM losers)
         |GROUP BY lang ORDER BY lang""".stripMargin) { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
      val comp = minhashComponents(s, dir)
      graft.dedup.DupClusters.keepCanonical(docs, "doc_id", comp)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"))
        .orderBy("lang")
    },

    // Order-independent table checksum (sum of 40-bit hash slices + count):
    // equal digests verify a snapshot against its source without moving
    // data — the backup-integrity primitive. Same canonical row-hash recipe
    // as q07.
    Q(
      "q83_table_checksum",
      """SELECT COALESCE(CAST(sum(CAST(('0x' || substr(h, 1, 10)) AS BIGINT)) AS VARCHAR), '0')
        |    AS checksum,
        |  count(*) AS n
        |FROM (SELECT md5(concat_ws(chr(1),
        |    coalesce(CAST(l_orderkey AS VARCHAR), chr(2)),
        |    coalesce(CAST(l_linenumber AS VARCHAR), chr(2)),
        |    coalesce(l_returnflag, chr(2)),
        |    coalesce(l_linestatus, chr(2)))) AS h FROM lineitem)""".stripMargin) { (s, dir) =>
      graft.load.Snapshot.tableChecksum(
        Tables.load(s, dir, "lineitem"),
        Seq("l_orderkey", "l_linenumber", "l_returnflag", "l_linestatus"))
    },

    // Text cleaning for web corpora: strip markup, collapse whitespace,
    // trim — regexp_replace is replace-all in Spark, needs 'g' in DuckDB.
    Q(
      "q84_text_clean",
      """SELECT doc_id,
        |  trim(regexp_replace(regexp_replace('<p>' || text || '</p> <br/>',
        |    '<[^>]+>', ' ', 'g'), '\s+', ' ', 'g')) AS clean
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "documents")
        .select(
          col("doc_id"),
          trim(regexp_replace(regexp_replace(
            concat(lit("<p>"), col("text"), lit("</p> <br/>")),
            "<[^>]+>", " "), "\\s+", " ")).as("clean"))
        .orderBy("doc_id")
    },

    // Column profiling (nulls / exact distincts / string-form min & max) in
    // ONE scan: all aggregates in a single partial->final aggregate, then
    // the result row explodes to long format.
    Q(
      "q85_profile",
      """SELECT * FROM (
        |  SELECT 'c_acctbal' AS col_name,
        |    CAST(sum(CASE WHEN c_acctbal IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
        |    count(DISTINCT c_acctbal) AS n_distinct,
        |    min(c_acctbal::VARCHAR) AS min_s, max(c_acctbal::VARCHAR) AS max_s FROM customer
        |  UNION ALL SELECT 'c_mktsegment',
        |    CAST(sum(CASE WHEN c_mktsegment IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |    count(DISTINCT c_mktsegment),
        |    min(c_mktsegment::VARCHAR), max(c_mktsegment::VARCHAR) FROM customer
        |  UNION ALL SELECT 'c_name',
        |    CAST(sum(CASE WHEN c_name IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |    count(DISTINCT c_name),
        |    min(c_name::VARCHAR), max(c_name::VARCHAR) FROM customer
        |  UNION ALL SELECT 'c_nationkey',
        |    CAST(sum(CASE WHEN c_nationkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |    count(DISTINCT c_nationkey),
        |    min(c_nationkey::VARCHAR), max(c_nationkey::VARCHAR) FROM customer)
        |ORDER BY col_name""".stripMargin) { (s, dir) =>
      graft.load.Profile.profile(
        Tables.load(s, dir, "customer"),
        Seq("c_acctbal", "c_mktsegment", "c_name", "c_nationkey"))
        .orderBy("col_name")
    },

    // Trained k-means: deterministic Lloyd (lowest-id init, d = c·c − 2·x·c
    // argmin with ties to the lowest centroid index, exact element-wise
    // means, no RNG) — so the ORACLE can replay the whole training: the
    // DuckDB side unrolls the same 3 Lloyd iterations as CTEs (same init,
    // same distance form, same tie-break, same empty-cluster keep-previous
    // rule) and must land on the identical per-vector assignment. Float
    // noise between engines sits at ~1e-15 relative on the distances, far
    // below any centroid-to-centroid gap, so the argmin decisions — the
    // only thing the output hashes — agree.
    Q("q86_kmeans_clusters", kmeansUnrolledOracle(k = 5, iters = 3, dims = 64)) { (s, dir) =>
      val emb = Tables.load(s, dir, "embeddings")
      val centroids = KMeans.fit(emb, "vec_id", "embedding", k = 5, iters = 3)
      KMeans.assign(emb, "embedding", centroids)
        .select(col("vec_id"), col("_cluster").cast("long").as("cluster"))
        .withColumn("cluster_n", count(lit(1)).over(Window.partitionBy("cluster")))
        .orderBy("vec_id")
    },

    // Simplified silhouette per vector (KMeans.simplifiedSilhouette) over
    // the q86 fit: the linear-time cluster-quality readout — nearest vs
    // second-nearest centroid distance, `(b − a)/max(a, b)` at 6 dp. The
    // oracle replays the fit AND the full x·x − 2·x·c + c·c folds.
    Q("q296_silhouette", silhouetteOracle(k = 5, iters = 3, dims = 64)) { (s, dir) =>
      val emb = Tables.load(s, dir, "embeddings")
      val centroids = KMeans.fit(emb, "vec_id", "embedding", k = 5, iters = 3)
      KMeans.simplifiedSilhouette(emb, "embedding", centroids)
        .select(col("vec_id"), col("cluster").cast("long").as("cluster"), col("sil"))
        .orderBy("vec_id")
    },

    // Sliding event-time windows (1 h window, 30 min slide): each event in
    // windowDuration/slide = 2 windows; the oracle enumerates the same
    // epoch-aligned windows arithmetically.
    Q(
      "q87_sliding_window",
      """SELECT strftime(wstart, '%Y-%m-%d %H:%M:%S') AS window_start, event_type, count(*) AS n
        |FROM (SELECT event_type,
        |        to_timestamp((epoch_us(ts) // 1800000000 - u.i) * 1800)::TIMESTAMP AS wstart
        |      FROM events, unnest([0, 1]) AS u(i)
        |      WHERE epoch_us(ts) // 1800000000 - u.i >= 0)
        |GROUP BY wstart, event_type ORDER BY window_start, event_type""".stripMargin) {
      (s, dir) =>
        Tables.events(s, dir)
          .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
          .agg(count(lit(1)).as("n"))
          .select(
            date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
            col("event_type"),
            col("n"))
          .orderBy("window_start", "event_type")
    },

    // Moving average over a row frame (4-row trailing): frame evaluation is
    // sequential over the sorted partition in both engines → identical
    // doubles; 4-dp rounding guards the print path.
    Q(
      "q88_moving_avg",
      """SELECT user_id, event_id,
        |  round(avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 4) AS mavg
        |FROM events ORDER BY user_id, event_id""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        .rowsBetween(-3, Window.currentRow)
      Tables.events(s, dir)
        .select(
          col("user_id"), col("event_id"),
          round(avg(col("value")).over(w), 4).as("mavg"))
        .orderBy("user_id", "event_id")
    },

    // Inter-event gap statistics (lag diff in microseconds): the
    // time-between-events profile behind bot detection and cadence
    // modeling; one shuffle shared by the lag window and the rollup.
    Q(
      "q89_interevent_gaps",
      """WITH g AS (SELECT user_id,
        |    epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id)) AS gap
        |  FROM events)
        |SELECT user_id, count(gap) AS n_gaps, CAST(min(gap) AS BIGINT) AS min_gap,
        |  CAST(max(gap) AS BIGINT) AS max_gap, CAST(sum(gap) AS BIGINT) AS total_gap
        |FROM g GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      Tables.events(s, dir)
        .select(
          col("user_id"),
          (unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(w))).as("gap"))
        .groupBy("user_id")
        .agg(
          count(col("gap")).as("n_gaps"),
          min(col("gap")).as("min_gap"),
          max(col("gap")).as("max_gap"),
          sum(col("gap")).as("total_gap"))
        .orderBy("user_id")
    },

    // Correlated EXISTS subquery: Catalyst decorrelates to a semi-join —
    // the SQL front door to the q59 shape. One SQL text drives BOTH engines.
    sqlBoth(
      "q90_correlated_exists",
      Seq("customer", "orders"),
      """SELECT c_custkey, c_name FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
        |ORDER BY c_custkey""".stripMargin),

    // Correlated scalar subquery: decorrelates to an aggregate + left join.
    sqlBoth(
      "q91_correlated_scalar",
      Seq("orders", "lineitem"),
      """SELECT o_orderkey,
        |  (SELECT count(*) FROM lineitem WHERE l_orderkey = o_orderkey) AS n_items
        |FROM orders ORDER BY o_orderkey LIMIT 1000""".stripMargin),

    // RANGE window frame over event time (trailing 24 h sum per user) —
    // decimal accumulation, so segment-tree vs sequential window
    // evaluation cannot diverge in the last ulp.
    Q(
      "q92_range_frame",
      """SELECT user_id, event_id,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) OVER (PARTITION BY user_id
        |    ORDER BY epoch_us(ts)
        |    RANGE BETWEEN 86400000000 PRECEDING AND CURRENT ROW) AS DOUBLE) AS day_sum
        |FROM events ORDER BY user_id, event_id""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("user_id")).orderBy(unix_micros(col("ts")))
        .rangeBetween(-86400000000L, Window.currentRow)
      Tables.events(s, dir)
        .select(
          col("user_id"), col("event_id"),
          sum(col("value").cast("decimal(18,2)")).over(w).cast("double").as("day_sum"))
        .orderBy("user_id", "event_id")
    },

    // INTERSECT (the q26 EXCEPT twin): set semantics incl. dedup.
    Q(
      "q93_intersect",
      """SELECT c_nationkey FROM customer
        |INTERSECT SELECT s_nationkey FROM supplier
        |ORDER BY c_nationkey""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "customer").select("c_nationkey")
        .intersect(Tables.load(s, dir, "supplier")
          .select(col("s_nationkey").as("c_nationkey")))
        .orderBy("c_nationkey")
    },

    // Group-wise z-score standardization (ML feature prep): moments from
    // exact decimal sums, then identical double arithmetic in both engines
    // (built-in stddev aggregates vary by algorithm — Welford vs sum of
    // squares — so the explicit formula is the portable one). Broadcast of
    // the tiny per-group stats joins back to the fact.
    Q(
      "q94_zscore",
      """WITH s AS (SELECT event_type,
        |    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sv,
        |    CAST(SUM(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS svv,
        |    count(*) AS n FROM events GROUP BY event_type)
        |SELECT e.event_id,
        |  CASE WHEN s.n > 1 AND s.svv - s.sv * s.sv / s.n > 0 THEN
        |    round((e.value - s.sv / s.n) / sqrt((s.svv - s.sv * s.sv / s.n) / (s.n - 1)), 6)
        |  END AS z
        |FROM events e JOIN s USING (event_type) ORDER BY e.event_id""".stripMargin) {
      (s, dir) =>
        val ev = Tables.events(s, dir)
        val stats = ev.groupBy("event_type").agg(
          sum(col("value").cast("decimal(18,2)")).cast("double").as("sv"),
          sum(col("value").cast("decimal(18,2)") * col("value").cast("decimal(18,2)"))
            .cast("double").as("svv"),
          count(lit(1)).as("n"))
        // z is null for single-row or zero-variance groups IN BOTH ENGINES —
        // an unguarded /0 diverges (Spark non-ANSI null vs DuckDB IEEE NaN)
        val varNum = col("svv") - col("sv") * col("sv") / col("n")
        ev.join(broadcast(stats), "event_type")
          .select(
            col("event_id"),
            when(col("n") > 1 && varNum > 0,
              round(
                (col("value") - col("sv") / col("n")) / sqrt(varNum / (col("n") - 1)),
                6)).as("z"))
          .orderBy("event_id")
    },

    // Quantile bucketing via ntile (equal-count bins; the feature-binning
    // primitive). Total order incl. tie-break → deterministic bins. NOT the
    // built-in window: `ntile(4) OVER (ORDER BY …)` with no PARTITION BY
    // collapses the table into one window partition; GlobalRank derives the
    // same buckets from a range-partitioned global row_number instead.
    Q(
      "q95_ntile",
      """SELECT o_orderkey,
        |  CAST(ntile(4) OVER (ORDER BY o_totalprice, o_orderkey) AS BIGINT) AS quartile
        |FROM orders ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
      graft.operators.GlobalRank.ntile(
        Tables.load(s, dir, "orders").select("o_orderkey", "o_totalprice"),
        Seq("o_totalprice", "o_orderkey"), buckets = 4, outCol = "quartile")
        .select(col("o_orderkey"), col("quartile"))
        .orderBy("o_orderkey")
    },

    // Per-document token diversity as Gini impurity 1 - sum(p^2): the
    // log-free twin of token entropy (rational arithmetic → engine-
    // portable); low values flag repetitive/boilerplate documents.
    Q(
      "q96_token_gini",
      """WITH tok AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t
        |            FROM documents),
        |tf AS (SELECT doc_id, u.tok AS token, count(*) AS c
        |       FROM tok, unnest(t) AS u(tok) GROUP BY 1, 2)
        |SELECT doc_id,
        |  round(1.0 - sum(c * c) * 1.0 / (sum(c) * sum(c)), 6) AS gini
        |FROM tf GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, dir) =>
      Vocab.giniDiversity(Tables.load(s, dir, "documents"), "doc_id", "text")
        .select(col("doc_id"), round(col("gini"), 6).as("gini"))
        .orderBy("doc_id")
    },

    // LATERAL correlated subquery join (per-order top-2 line items): the
    // SQL spelling of dependent per-row subplans; Catalyst decorrelates
    // the sorted-limited lateral into a window-ranked join.
    sqlBoth(
      "q97_lateral_topk",
      Seq("orders", "lineitem"),
      """SELECT o_orderkey, l.l_linenumber FROM orders, LATERAL (
        |  SELECT l_linenumber FROM lineitem WHERE l_orderkey = o_orderkey
        |  ORDER BY l_quantity DESC, l_linenumber LIMIT 2) AS l
        |ORDER BY o_orderkey, l.l_linenumber""".stripMargin),

    // Rank-to-[0,1] window family (percent_rank / cume_dist): rational
    // rank arithmetic, deterministic under the total order. GlobalRank
    // computes both from a distributed row_number — the (o_totalprice,
    // o_orderkey) order is total, so rank == row_number and the tie-group
    // join is skipped (tiesPossible = false).
    Q(
      "q98_rank_ratios",
      """SELECT o_orderkey,
        |  round(percent_rank() OVER w, 6) AS prk,
        |  round(cume_dist() OVER w, 6) AS cd
        |FROM orders WINDOW w AS (ORDER BY o_totalprice, o_orderkey)
        |ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
      graft.operators.GlobalRank.rankRatios(
        Tables.load(s, dir, "orders").select("o_orderkey", "o_totalprice"),
        Seq("o_totalprice", "o_orderkey"),
        prkCol = "prk", cdCol = "cd", tiesPossible = false)
        .select(col("o_orderkey"), round(col("prk"), 6).as("prk"), round(col("cd"), 6).as("cd"))
        .orderBy("o_orderkey")
    },

    // Exactly-n deterministic sample: TopK by md5 sort key (global sort
    // avoided — per-partition top-n + merge). Same 50 docs on any engine.
    Q(
      "q99_fixed_sample",
      """SELECT doc_id, lang FROM documents
        |ORDER BY md5(doc_id::VARCHAR), doc_id LIMIT 50""".stripMargin) { (s, dir) =>
      graft.load.Splits.fixedSample(Tables.load(s, dir, "documents"), col("doc_id"), 50)
        .select("doc_id", "lang")
    },

    // Stratified rebalancing sample: per-language keep rates (en 0.25,
    // de 0.5, rest whole) via the md5-uniform keep rule — binary-fraction
    // rates make every keep decision bit-identical across engines.
    Q(
      "q107_stratified_sample",
      """SELECT lang, count(*) AS n, CAST(sum(doc_id) AS BIGINT) AS sum_id
        |FROM documents
        |WHERE CAST(CAST(('0x' || substr(md5(doc_id::VARCHAR), 1, 6)) AS BIGINT) AS DOUBLE)
        |    / 16777216.0
        |  < CASE lang WHEN 'en' THEN 0.25 WHEN 'de' THEN 0.5 ELSE 1.0 END
        |GROUP BY lang ORDER BY lang NULLS FIRST""".stripMargin) { (s, dir) =>
      Splits.stratifiedSample(
        Tables.load(s, dir, "documents"), "lang", col("doc_id"),
        Map("en" -> 0.25, "de" -> 0.5))
        .groupBy("lang")
        .agg(count(lit(1)).as("n"), sum(col("doc_id")).as("sum_id"))
        .orderBy("lang")
    },

    // Row-level snapshot diff — the backup-verification op one step past
    // the q83 checksum: WHICH keys were added/removed/changed between two
    // snapshots. Snapshot b is derived from a by deterministic predicates,
    // so the oracle states the expected diff directly from those
    // predicates while Spark has to discover it via the hash-compare
    // full-outer join.
    Q(
      "q105_snapshot_diff",
      """WITH k AS (SELECT DISTINCT l_orderkey, l_linenumber FROM lineitem)
        |SELECT l_orderkey, l_linenumber, change FROM (
        |  SELECT l_orderkey, l_linenumber,
        |    CASE WHEN l_orderkey % 97 = 0 THEN 'removed'
        |         WHEN l_orderkey % 89 = 0 THEN 'changed' END AS change
        |  FROM k
        |  UNION ALL
        |  SELECT l_orderkey + 100000000, l_linenumber, 'added'
        |  FROM k WHERE l_orderkey % 101 = 0)
        |WHERE change IS NOT NULL
        |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, dir) =>
      // the synthetic lineitem does NOT enforce the TPC-H PK, so build the
      // snapshot at (orderkey, linenumber) grain first — diffTables requires
      // a unique key (see its scaladoc)
      val a = Tables.load(s, dir, "lineitem")
        .groupBy("l_orderkey", "l_linenumber")
        .agg(sum(col("l_quantity").cast("decimal(18,2)")).as("qty"))
      val b = a.filter(pmod(col("l_orderkey"), lit(97)) =!= 0)
        .withColumn(
          "qty",
          when(pmod(col("l_orderkey"), lit(89)) === 0, col("qty") + 1)
            .otherwise(col("qty")))
        .unionByName(
          a.filter(pmod(col("l_orderkey"), lit(101)) === 0)
            .withColumn("l_orderkey", col("l_orderkey") + lit(100000000L)))
      graft.load.Snapshot
        .diffTables(a, b, Seq("l_orderkey", "l_linenumber"), Seq("qty"))
        .orderBy("l_orderkey", "l_linenumber")
    },

    // SCD Type-2 upsert: MERGE that keeps history — each updated key's open
    // row closes at the update version and a new open row appends; the
    // validity intervals reconstruct the state as of any version.
    Q(
      "q106_scd2_upsert",
      """SELECT c_custkey, bal, valid_from, valid_to FROM (
        |  SELECT c_custkey,
        |    CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS DOUBLE) AS bal,
        |    CAST(0 AS BIGINT) AS valid_from,
        |    CASE WHEN c_custkey % 7 = 0 THEN CAST(5 AS BIGINT) END AS valid_to
        |  FROM customer
        |  UNION ALL
        |  SELECT c_custkey,
        |    CAST(CAST(c_acctbal AS DECIMAL(18,2)) + 100 AS DOUBLE),
        |    CAST(5 AS BIGINT), CAST(NULL AS BIGINT)
        |  FROM customer WHERE c_custkey % 7 = 0)
        |ORDER BY c_custkey, valid_from""".stripMargin) { (s, dir) =>
      val cust = Tables.load(s, dir, "customer")
      val current = cust.select(
        col("c_custkey"),
        col("c_acctbal").cast("decimal(18,2)").cast("double").as("bal"),
        lit(0L).as("valid_from"),
        lit(null).cast("long").as("valid_to"))
      val updates = cust.filter(pmod(col("c_custkey"), lit(7)) === 0)
        .select(
          col("c_custkey"),
          (col("c_acctbal").cast("decimal(18,2)") + lit(100)).cast("double").as("bal"),
          lit(5L).as("_ver"))
      graft.load.Snapshot
        .upsertScd2(current, updates, Seq("c_custkey"), "_ver")
        .orderBy("c_custkey", "valid_from")
    },

    // Bloom-reduced exact semi join (runtime-filter shape, explicit): the
    // big side is pre-filtered by a bloom of the small side's keys before
    // its exchange; the exact join removes false positives, so rows equal
    // the plain semi join the oracle runs.
    Q(
      "q101_bloom_semi",
      """SELECT l.l_returnflag, count(*) AS n,
        |  CAST(sum(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
        |FROM lineitem l
        |WHERE l.l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_totalprice > 400000)
        |GROUP BY l.l_returnflag ORDER BY l.l_returnflag""".stripMargin) { (s, dir) =>
      val hot = Tables.load(s, dir, "orders")
        .filter(col("o_totalprice") > 400000).select("o_orderkey")
      graft.operators.BloomPrune.semiJoinReduced(
        Tables.load(s, dir, "lineitem"), hot, "l_orderkey", "o_orderkey")
        .groupBy("l_returnflag")
        .agg(
          count(lit(1)).as("n"),
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("qty"))
        .orderBy("l_returnflag")
    },

    // Bloom-reduced exact ANTI join — the shape of the pipeline's
    // cross-file dedup at 100 TB: bloom-negative rows ("never seen") skip
    // the join entirely; only candidates pay the exchange.
    Q(
      "q102_bloom_anti",
      """SELECT l.l_returnflag, count(*) AS n
        |FROM lineitem l
        |WHERE l.l_orderkey NOT IN (SELECT o_orderkey FROM orders WHERE o_totalprice > 400000)
        |GROUP BY l.l_returnflag ORDER BY l.l_returnflag""".stripMargin) { (s, dir) =>
      val hot = Tables.load(s, dir, "orders")
        .filter(col("o_totalprice") > 400000).select("o_orderkey")
      graft.operators.BloomPrune.antiJoinReduced(
        Tables.load(s, dir, "lineitem"), hot, "l_orderkey", "o_orderkey")
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"))
        .orderBy("l_returnflag")
    },

    // URL parsing for web-corpus curation: host extraction + per-domain
    // rollup (Spark's parse_url; the oracle regexes the same grammar).
    Q(
      "q77_url_host",
      """SELECT regexp_extract('https://' || source || '.example.com/' || lang || '/' || doc_id,
        |    'https://([^/]+)/', 1) AS host, count(*) AS n
        |FROM documents GROUP BY host ORDER BY host""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "documents")
        .select(parse_url(
          concat(lit("https://"), col("source"), lit(".example.com/"),
            col("lang"), lit("/"), col("doc_id").cast("string")),
          lit("HOST")).as("host"))
        .groupBy("host")
        .agg(count(lit(1)).as("n"))
        .orderBy("host")
    },

    // End-to-end corpus pipeline gate: quality filter → exact dedup →
    // MinHash-LSH + Jaccard near-dup clustering (canonical per component) →
    // benchmark decontamination → deterministic split → snapshot append,
    // run as ONE CorpusPipeline.processBatch against a fresh corpus; the
    // gate reads back what the pipeline actually WROTE, so the composite —
    // not just its parts — is oracle-checked.
    Q(
      "q110_corpus_pipeline",
      s"""WITH RECURSIVE $CorpusPipelineCtes
         |SELECT doc_id,
         |  CASE WHEN b < 8 THEN 'train' WHEN b = 8 THEN 'val' ELSE 'test' END AS split
         |FROM (SELECT doc_id,
         |        CAST(('0x' || substr(md5(doc_id::VARCHAR), 1, 6)) AS BIGINT) % 10 AS b
         |      FROM kept)
         |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      corpusRun(s, dir)._1
    },

    // The same run's audit counts (the pipeline Result the daemon would
    // log): the oracle recomputes every stage-transition delta from scratch.
    Q(
      "q111_corpus_audit",
      s"""WITH RECURSIVE $CorpusPipelineCtes
         |SELECT
         |  (SELECT count(*) FROM kept) AS ingested,
         |  (SELECT count(*) FROM qual) - (SELECT count(*) FROM fw) AS exact_dups,
         |  (SELECT count(*) FROM fw) - (SELECT count(*) FROM ded) AS near_dups,
         |  (SELECT count(*) FROM ann) - (SELECT count(*) FROM qual) AS rejected,
         |  (SELECT count(*) FROM ded) - (SELECT count(*) FROM kept) AS contaminated""".stripMargin) {
      (s, dir) => corpusRun(s, dir)._2
    },

    // Sequence-packing manifest (concat-then-split, the GPT-style
    // pretraining layout): docs concatenate in doc_id order and split at
    // 2048-token boundaries; each doc's bin span is pure arithmetic over
    // the global EXCLUSIVE token prefix sum. The prefix sum is the
    // distributed two-pass GlobalRank shape (range partition + O(partitions)
    // driver longs) — a bare `sum OVER (ORDER BY)` would collapse to one
    // task at 100 TB.
    Q(
      "q113_pack_manifest",
      """WITH tk AS (SELECT doc_id,
        |    len(list_filter(regexp_extract_all(lower(text), '[a-z0-9]+'), x -> x != '')) AS n_tokens
        |  FROM documents),
        |p AS (SELECT doc_id, n_tokens,
        |    CAST(coalesce(sum(n_tokens) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS tok_offset
        |  FROM tk WHERE n_tokens > 0)
        |SELECT doc_id, n_tokens, tok_offset,
        |  CAST(tok_offset // 2048 AS BIGINT) AS first_bin,
        |  CAST((tok_offset + n_tokens - 1) // 2048 AS BIGINT) AS last_bin
        |FROM p ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
        .select(
          col("doc_id"),
          graft.text.TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"))
        .filter(col("n_tokens") > 0)
      graft.operators.GlobalRank
        .withRunningTotal(docs, Seq("doc_id"), "n_tokens", "tok_offset")
        .withColumn("first_bin", floor(col("tok_offset") / 2048).cast("long"))
        .withColumn(
          "last_bin",
          floor((col("tok_offset") + col("n_tokens") - 1) / 2048).cast("long"))
        .orderBy("doc_id")
    },

    // Token-budget selection: take docs in deterministic md5(doc_id) order
    // until a 50k-token budget is exhausted (the doc crossing the boundary
    // is kept — it started inside the budget). Same prefix-sum primitive,
    // ordered by the hash so the sample is unbiased yet reproducible on any
    // engine/partitioning.
    Q(
      "q114_token_budget",
      """WITH tk AS (SELECT doc_id,
        |    len(list_filter(regexp_extract_all(lower(text), '[a-z0-9]+'), x -> x != '')) AS n_tokens,
        |    md5(doc_id::VARCHAR) AS h
        |  FROM documents),
        |p AS (SELECT doc_id, n_tokens,
        |    coalesce(sum(n_tokens) OVER (ORDER BY h
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS tok_offset
        |  FROM tk WHERE n_tokens > 0)
        |SELECT doc_id, n_tokens FROM p WHERE tok_offset < 50000
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
        .select(
          col("doc_id"),
          graft.text.TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"),
          md5(col("doc_id").cast("string")).as("_h"))
        .filter(col("n_tokens") > 0)
      graft.operators.GlobalRank
        .withRunningTotal(docs, Seq("_h"), "n_tokens", "tok_offset")
        .filter(col("tok_offset") < 50000)
        .select("doc_id", "n_tokens")
        .orderBy("doc_id")
    },

    // Corpus-level repeated-span removal (the RefinedWeb "duplicated line"
    // correction over 10-token spans): spans occurring in >= 2 distinct
    // docs (duplicated bodies, boilerplate) are dropped and each doc is
    // reassembled from its surviving spans in order.
    Q(
      "q120_span_dedup",
      """WITH tok AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t FROM documents),
        |c AS (SELECT doc_id, t, len(t) AS n FROM tok WHERE len(t) > 0),
        |ch AS (SELECT doc_id, u.i AS cid,
        |    array_to_string(t[u.i*10+1 : least(u.i*10+10, n)], ' ') AS ctext
        |  FROM c, unnest(generate_series(0, (greatest(n - 10, 0) + 9) // 10)) AS u(i)),
        |hot AS (SELECT ctext FROM (SELECT ctext, count(DISTINCT doc_id) AS nd
        |                           FROM ch GROUP BY ctext) WHERE nd >= 2),
        |j AS (SELECT ch.doc_id, ch.cid, ch.ctext, h.ctext IS NOT NULL AS ishot
        |  FROM ch LEFT JOIN hot h ON ch.ctext = h.ctext)
        |SELECT doc_id,
        |  coalesce(array_to_string(list(ctext ORDER BY cid) FILTER (WHERE NOT ishot), ' '), '')
        |    AS kept_text,
        |  CAST(count(*) AS BIGINT) AS n_spans,
        |  CAST(sum(CASE WHEN ishot THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped
        |FROM j GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, dir) =>
      graft.text.TextAnalysis.stripRepeatedSpans(
        Tables.load(s, dir, "documents"), "doc_id", "text", spanTokens = 10, minDocs = 2)
        .orderBy("doc_id")
    },

    // Temperature-flattened language rebalancing at alpha = 1/2: the
    // dominant stratum downsamples toward a flatter mix, the smallest
    // keeps everything; the keep decision is exact integer arithmetic
    // (h^2 * n_s < n_min * 2^24), bit-identical in any engine with md5.
    Q(
      "q121_temperature_mix",
      """WITH c AS (SELECT lang, CAST(count(*) AS BIGINT) AS ns FROM documents GROUP BY lang),
        |m AS (SELECT min(ns) AS nmin FROM c),
        |h AS (SELECT doc_id, lang,
        |    CAST(('0x' || substr(md5(doc_id::VARCHAR), 1, 3)) AS BIGINT) AS h12
        |  FROM documents)
        |SELECT h.doc_id, h.lang FROM h JOIN c USING (lang), m
        |WHERE h12 * h12 * c.ns < m.nmin * 16777216
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      Splits.temperatureRebalanceSqrt(
        Tables.load(s, dir, "documents"), "lang", col("doc_id"))
        .select("doc_id", "lang")
        .orderBy("doc_id")
    },

    // Count-Min sketch heavy hitters: a 4x256 md5-hashed counter grid over
    // all token occurrences, point-estimated (min over rows) for the true
    // top-20 tokens. The sketch table is depth*width rows REGARDLESS of
    // stream size — the fixed-footprint summary of an unbounded stream —
    // and the md5 hash family makes even its collisions engine-portable:
    // the oracle rebuilds the identical grid and must land the identical
    // (over-)estimates.
    Q(
      "q125_countmin_heavy",
      """WITH occ AS (SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token
        |  FROM documents),
        |ex AS (SELECT token, CAST(count(*) AS BIGINT) AS exact_n FROM occ GROUP BY token),
        |top AS (SELECT token, exact_n FROM ex ORDER BY exact_n DESC, token LIMIT 20),
        |cells AS (SELECT r.r AS row,
        |    CAST(('0x' || substr(md5(r.r::VARCHAR || ':' || token), 1, 6)) AS BIGINT) % 256 AS cell
        |  FROM occ, unnest(generate_series(0, 3)) AS r(r)),
        |sk AS (SELECT row, cell, CAST(count(*) AS BIGINT) AS c FROM cells GROUP BY row, cell),
        |probe AS (SELECT t.token, t.exact_n, r.r AS row,
        |    CAST(('0x' || substr(md5(r.r::VARCHAR || ':' || t.token), 1, 6)) AS BIGINT) % 256 AS cell
        |  FROM top t, unnest(generate_series(0, 3)) AS r(r))
        |SELECT p.token, p.exact_n, CAST(min(s.c) AS BIGINT) AS cm_est
        |FROM probe p JOIN sk s USING (row, cell)
        |GROUP BY p.token, p.exact_n
        |ORDER BY exact_n DESC, token""".stripMargin) { (s, dir) =>
      val occ = Tables.load(s, dir, "documents")
        .select(explode(graft.text.TextAnalysis.tokens(col("text"))).as("token"))
      val top = occ.groupBy("token").agg(count(lit(1)).as("exact_n"))
        .orderBy(col("exact_n").desc, col("token")).limit(20)
      val sk = graft.operators.CountMinSketch.build(occ, col("token"), depth = 4, width = 256)
      graft.operators.CountMinSketch.estimate(sk, top, "token", depth = 4, width = 256)
        .orderBy(col("exact_n").desc, col("token"))
    },

    // URL canonicalization — the dedup-key normalizer of web-corpus
    // curation: messy synthesized URLs (uppercase www host, default port,
    // utm_* tracking params, fragment) reduce to the canonical form the
    // URL-dedup join would key on. Four URL shapes by doc_id%4 pin the
    // scoping rules: https:443 stripped but http:443 KEPT (non-default
    // port), a /docs/utm_guide path segment and an xutm_source param KEPT
    // (utm stripping sees only &-anchored query params), http:80 stripped,
    // all-utm query vanishing without a dangling '?'. Both engines run the
    // identical split-at-'?' + global-regexp algebra (RE2-safe, no
    // lookarounds).
    Q(
      "q127_url_canonical",
      """WITH raw AS (SELECT doc_id,
        |    CASE doc_id % 4
        |      WHEN 0 THEN 'HTTPS://WWW.' || upper(source) || '.Example.COM:443/' || lang
        |        || '/' || doc_id || '?utm_source=feed&id=' || doc_id
        |        || '&utm_campaign=c' || (doc_id % 3) || '&ref=r' || (doc_id % 5) || '#sec'
        |      WHEN 1 THEN 'http://' || source || '.example.com:443/' || lang || '/' || doc_id
        |        || '?id=' || doc_id
        |      WHEN 2 THEN 'https://' || source || '.example.com/docs/utm_guide/' || doc_id
        |        || '?xutm_source=1&utm_medium=m&id=' || doc_id
        |      ELSE 'HTTP://WWW.' || upper(source) || '.Example.COM:80/' || lang
        |        || '?utm_only=1#f'
        |    END AS u
        |  FROM documents),
        |s1 AS (SELECT doc_id, regexp_replace(u, '#.*', '', 'g') AS u FROM raw),
        |s2 AS (SELECT doc_id, u, regexp_extract(u, '^[a-zA-Z]+://[^/?]+') AS p FROM s1),
        |s3 AS (SELECT doc_id,
        |    regexp_replace(regexp_replace(regexp_replace(lower(p),
        |        '^(https://[^/]*):443$', '\1'), '^(http://[^/]*):80$', '\1'),
        |      '://www\.', '://', 'g') AS host,
        |    substr(u, length(p) + 1) AS rest
        |  FROM s2),
        |s4 AS (SELECT doc_id, host, rest, strpos(rest, '?') AS qp FROM s3),
        |s5 AS (SELECT doc_id, host,
        |    CASE WHEN qp > 0 THEN substr(rest, 1, qp - 1) ELSE rest END AS path,
        |    regexp_replace(regexp_replace(
        |      '&' || CASE WHEN qp > 0 THEN substr(rest, qp + 1) ELSE '' END,
        |      '&utm_[^&]*', '', 'g'), '^&', '') AS cleaned
        |  FROM s4)
        |SELECT doc_id,
        |  host || path || CASE WHEN cleaned = '' THEN '' ELSE '?' || cleaned END AS url
        |FROM s5 ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val d = col("doc_id").cast("string")
      val raw = when(col("doc_id") % 4 === 0, concat(
          lit("HTTPS://WWW."), upper(col("source")), lit(".Example.COM:443/"),
          col("lang"), lit("/"), d, lit("?utm_source=feed&id="), d,
          lit("&utm_campaign=c"), (col("doc_id") % 3).cast("string"),
          lit("&ref=r"), (col("doc_id") % 5).cast("string"), lit("#sec")))
        .when(col("doc_id") % 4 === 1, concat(
          lit("http://"), col("source"), lit(".example.com:443/"), col("lang"),
          lit("/"), d, lit("?id="), d))
        .when(col("doc_id") % 4 === 2, concat(
          lit("https://"), col("source"), lit(".example.com/docs/utm_guide/"), d,
          lit("?xutm_source=1&utm_medium=m&id="), d))
        .otherwise(concat(
          lit("HTTP://WWW."), upper(col("source")), lit(".Example.COM:80/"),
          col("lang"), lit("?utm_only=1#f")))
      Tables.load(s, dir, "documents")
        .select(col("doc_id"), graft.text.TextAnalysis.canonicalizeUrl(raw).as("url"))
        .orderBy("doc_id")
    },

    // URL-level dedup (the CCNet first stage): four messy renderings of the
    // same page — www + default port + utm + fragment variants by doc_id%4
    // — must collapse onto ONE canonical key, then first-wins group-dedup
    // keeps the lowest doc_id. The oracle is INDEPENDENT: it states the
    // intended canonical form directly ('https://example.com/p' || k)
    // rather than replaying the normalizer, so any canonicalization drift
    // on any of the four shapes fails the gate. Scale shape: stateless
    // canonicalize projection + one groupBy on the canonical key.
    Q(
      "q138_url_dedup",
      """WITH c AS (SELECT doc_id, 'https://example.com/p' || (doc_id % 50) AS url
        |           FROM documents)
        |SELECT url, min(doc_id) AS keep_id, CAST(count(*) AS BIGINT) AS n_dups
        |FROM c GROUP BY url ORDER BY url""".stripMargin) { (s, dir) =>
      val k = (col("doc_id") % 50).cast("string")
      val raw = when(col("doc_id") % 4 === 0,
          concat(lit("HTTPS://WWW.EXAMPLE.COM:443/p"), k,
            lit("?utm_source=a&utm_medium=m#x")))
        .when(col("doc_id") % 4 === 1, concat(lit("https://example.com/p"), k))
        .when(col("doc_id") % 4 === 2,
          concat(lit("https://www.example.com/p"), k, lit("?utm_only=1")))
        .otherwise(concat(lit("HTTPS://Example.Com:443/p"), k, lit("#frag")))
      Tables.load(s, dir, "documents")
        .select(col("doc_id"), graft.text.TextAnalysis.canonicalizeUrl(raw).as("url"))
        .groupBy("url")
        .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_dups"))
        .orderBy("url")
    },

    // Sequential Poisson sampling (Splits.weightedSample): exactly-100
    // sample with inclusion ~proportional to n_chars — the "sample tokens,
    // not documents" knob. Priority ξ = md5-uniform / weight is one IEEE
    // division of exactly-agreed operands (no RNG, no libm), and the pick
    // is the fixedSample TopK shape — per-partition top-n + merge, never a
    // global sort.
    Q(
      "q164_weighted_sample",
      """SELECT doc_id, lang, n_chars FROM documents
        |WHERE n_chars > 0
        |ORDER BY (CAST(CAST(('0x' || substr(md5(doc_id::VARCHAR), 1, 6)) AS BIGINT) AS DOUBLE)
        |    / 16777216.0) / CAST(n_chars AS DOUBLE), doc_id
        |LIMIT 100""".stripMargin) { (s, dir) =>
      Splits.weightedSample(
        Tables.load(s, dir, "documents"), col("doc_id"), col("n_chars"), 100)
        .select("doc_id", "lang", "n_chars")
    },

    // SemDeDup (Similarity.semanticDedup): k-means clusters the embedding
    // space (the same fit q86 gates), then within-cluster cosine ≥ 0.3
    // drops every higher-id member — first-wins semantic dedup with the
    // pair space bounded to (n/k)² per cluster. The oracle replays the
    // full fit from scratch AND the pair decisions.
    Q("q165_semdedup", semDedupOracle(k = 5, iters = 3, dims = 64, tau = 0.3)) {
      (s, dir) =>
        graft.sim.Similarity.semanticDedup(
          Tables.load(s, dir, "embeddings"), "vec_id", "embedding",
          k = 5, iters = 3, minCosine = 0.3)
          .orderBy("vec_id")
    },

    // Unicode NFC normalization (functions.NfcNormalize, SQL
    // `nfc_normalize`): the canonical-composition pass that belongs before
    // any hash/dedup on real text. The corpus is ASCII, so each doc gets a
    // decomposed suffix (e + U+0301, A + U+0308) appended IN THE QUERY —
    // normalization composes both pairs (char length drops by exactly 2),
    // and both engines implement the same Unicode mapping (JDK Normalizer
    // here, utf8proc in the oracle).
    Q(
      "q169_nfc_normalize",
      """SELECT doc_id, nfc_normalize(s) AS norm,
        |  length(s) AS n_raw, length(nfc_normalize(s)) AS n_norm
        |FROM (SELECT doc_id, substr(text, 1, 24) || 'e' || chr(769) || 'A' || chr(776) AS s
        |      FROM documents)
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val raw = concat(substring(col("text"), 1, 24), lit("e\u0301A\u0308"))
      Tables.load(s, dir, "documents")
        .select(
          col("doc_id"),
          graft.functions.NfcNormalize.nfc(raw).as("norm"),
          length(raw).cast("long").as("n_raw"),
          length(graft.functions.NfcNormalize.nfc(raw)).cast("long").as("n_norm"))
        .orderBy("doc_id")
    })
}
