package graft.queries

import graft.Tables
import org.apache.spark.sql.functions._

/** Round-14 gates. Opens by finishing the Layer III window-switching
  * surface: START/STOP transient-bracket blocks (types 1/3) and
  * INTENSITY joint stereo were the last typed rejections real music
  * hits ([[graft.multimodal.Mp3Codec]] — both closed-form spec math,
  * unlike the honestly-excluded Table B.3 polyphase window).
  */
object Round14Queries {

  def all: Seq[Q] = Seq(

    // START/STOP BLOCK MP3 DECODE (Mp3Codec block_type 1/3) — the
    // long→short/short→long transition bracket every real encoder
    // writes around a transient run: granule 0 is a type-1 START
    // block, granule 1 a type-3 STOP block. Both are LONG-family
    // (21-sfb layout, no subblock gains) but arrive through the
    // WINDOW-SWITCHING side-info layout with the implicit region
    // split — a layout mistake shifts every later side-info field and
    // lands off the hash; a decoder that still rejects types 1/3
    // fails the query outright. Spectra replay exactly as q355; the
    // block_type column pins the parsed type. The type-specific IMDCT
    // windows are spec-gated (Mp3Spec — cosines have no SQL form).
    Q(
      "q362_mp3_start_stop",
      """WITH fg AS (
        |  SELECT doc_id, f.f AS f, gr.gr AS gr FROM documents,
        |    unnest(generate_series(0, 1)) AS f(f),
        |    unnest(generate_series(0, 1)) AS gr(gr)),
        |par AS (
        |  SELECT doc_id, f, gr,
        |    4 + (doc_id + f) % 5 AS npairs,
        |    3 + (doc_id + 2*f + gr) % 4 AS nquads,
        |    (doc_id + f + gr) % 5 AS g
        |  FROM fg),
        |pp AS (
        |  SELECT doc_id, f, gr, p.p AS p,
        |    (doc_id + 3*gr + 7*p.p + f) % 2 AS mx,
        |    (doc_id*5 + gr + 11*p.p + 2*f) % 2 AS my,
        |    (doc_id + p.p + f) % 2 AS sx,
        |    (doc_id + p.p + gr) % 2 AS sy
        |  FROM par, unnest(generate_series(0, 8)) AS p(p)
        |  WHERE p.p < npairs),
        |qq AS (
        |  SELECT doc_id, f, gr, q.q AS q, j.j AS j,
        |    CASE j.j WHEN 1 THEN (doc_id + q.q + f) % 2
        |             WHEN 2 THEN (doc_id + 3*q.q + gr) % 2
        |             WHEN 3 THEN (doc_id + 5*q.q + f + gr) % 2
        |             ELSE (doc_id + 7*q.q + 1) % 2 END AS mag,
        |    (doc_id + q.q + j.j) % 2 AS s
        |  FROM par, unnest(generate_series(0, 6)) AS q(q),
        |       unnest(generate_series(1, 4)) AS j(j)
        |  WHERE q.q < nquads),
        |lines AS (
        |  SELECT doc_id, f, gr, 2*p + xy.xy AS line,
        |    CASE WHEN xy.xy = 0 THEN mx ELSE my END AS mag,
        |    CASE WHEN xy.xy = 0 THEN sx ELSE sy END AS s
        |  FROM pp, unnest(generate_series(0, 1)) AS xy(xy)
        |  UNION ALL
        |  SELECT q.doc_id, q.f, q.gr,
        |    2*a.npairs + 4*q.q + (q.j - 1) AS line, q.mag, q.s
        |  FROM qq q JOIN par a USING (doc_id, f, gr)),
        |pbits AS (
        |  SELECT doc_id, f, gr,
        |    sum(CASE WHEN mx = 0 AND my = 0 THEN 1
        |             WHEN mx = 1 AND my = 0 THEN 2 ELSE 3 END + mx + my) AS b
        |  FROM pp GROUP BY doc_id, f, gr),
        |qbits AS (
        |  SELECT doc_id, f, gr, sum(1 + mag) AS b
        |  FROM qq GROUP BY doc_id, f, gr),
        |feat AS (
        |  SELECT doc_id, f, gr, sum(mag) AS nnz,
        |    sum(mag * (1 - 2*s) * (line + 1)) AS wsum
        |  FROM lines GROUP BY doc_id, f, gr)
        |SELECT a.doc_id AS media_id,
        |  CAST(a.f AS BIGINT) AS frame_idx,
        |  CAST(a.gr AS BIGINT) AS granule,
        |  CAST(0 AS BIGINT) AS channel,
        |  CAST(CASE a.gr WHEN 0 THEN 1 ELSE 3 END AS BIGINT) AS block_type,
        |  CAST(a.npairs AS BIGINT) AS big_values,
        |  CAST(210 + 4*a.g AS BIGINT) AS global_gain,
        |  CAST(pb.b + qb.b AS BIGINT) AS part2_3_length,
        |  CAST(ft.nnz AS BIGINT) AS n_nonzero,
        |  CAST(ft.nnz * CAST(power(2, a.g) AS BIGINT) * 1000000 AS BIGINT)
        |    AS sum_abs_micro,
        |  CAST(ft.wsum * CAST(power(2, a.g) AS BIGINT) * 1000000 AS BIGINT)
        |    AS checksum_micro
        |FROM par a
        |JOIN pbits pb USING (doc_id, f, gr)
        |JOIN qbits qb USING (doc_id, f, gr)
        |JOIN feat ft USING (doc_id, f, gr)
        |ORDER BY media_id, frame_idx, granule""".stripMargin) { (s, dir) =>
      graft.multimodal.Multimodal.extractMp3SpectraTyped(
        graft.multimodal.Multimodal.synthesizeMp3CodedStartStop(
          Tables.load(s, dir, "documents"), "doc_id"))
        .orderBy("media_id", "frame_idx", "granule")
    },

    // INTENSITY JOINT STEREO MP3 (Mp3Codec mode_extension 01) — the
    // other joint-stereo reconstruction real music hits: channel 1's
    // upper spectrum is NOT transmitted; its scalefactors there carry
    // stereo POSITIONS, and both channels rebuild from channel 0's
    // lines. The synthesizer codes ch0 long (lines past several band
    // boundaries) and ch1 short, so the intensity region starts at
    // ch1's last coded line rounded up to a band boundary — the oracle
    // replays the bound, the band lookup, the is_pos extraction from
    // ch1's 3-bit scalefactors (bands 11–20; lower intensity bands
    // read is_pos 0 from their zero-length scalefactor slots), and the
    // pan: is_pos 0 → fully right, 6 → fully left, 7 (ILLEGAL) →
    // pass-through. Positions with irrational ratios (1–5) are
    // spec-gated in-JVM where both sides share one libm.
    Q(
      "q363_mp3_intensity",
      """WITH fgc AS (
        |  SELECT doc_id, f.f AS f, gr.gr AS gr, ch.ch AS ch,
        |    CASE ch.ch WHEN 0 THEN doc_id ELSE doc_id + 1000003 END AS rid,
        |    CASE ch.ch WHEN 0 THEN 10 ELSE 2 END AS bp,
        |    CASE ch.ch WHEN 0 THEN 8 ELSE 1 END AS bq
        |  FROM documents,
        |    unnest(generate_series(0, 1)) AS f(f),
        |    unnest(generate_series(0, 1)) AS gr(gr),
        |    unnest(generate_series(0, 1)) AS ch(ch)),
        |par AS (SELECT doc_id, f, gr, ch, rid,
        |    bp + (rid + f) % 5 AS npairs,
        |    bq + (rid + 2*f + gr) % 4 AS nquads,
        |    (rid + f + gr) % 5 AS g
        |  FROM fgc),
        |pp AS (SELECT doc_id, f, gr, ch, p.p AS p,
        |    (rid + 3*gr + 7*p.p + f) % 2 AS mx,
        |    (rid*5 + gr + 11*p.p + 2*f) % 2 AS my,
        |    (rid + p.p + f) % 2 AS sx,
        |    (rid + p.p + gr) % 2 AS sy
        |  FROM par, unnest(generate_series(0, 14)) AS p(p)
        |  WHERE p.p < npairs),
        |qq AS (SELECT doc_id, f, gr, ch, q.q AS q, j.j AS j,
        |    CASE j.j WHEN 1 THEN (rid + q.q + f) % 2
        |             WHEN 2 THEN (rid + 3*q.q + gr) % 2
        |             WHEN 3 THEN (rid + 5*q.q + f + gr) % 2
        |             ELSE (rid + 7*q.q + 1) % 2 END AS mag,
        |    (rid + q.q + j.j) % 2 AS s
        |  FROM par, unnest(generate_series(0, 11)) AS q(q),
        |       unnest(generate_series(1, 4)) AS j(j)
        |  WHERE q.q < nquads),
        |lines AS (
        |  SELECT doc_id, f, gr, ch, 2*p + xy.xy AS line,
        |    CASE WHEN xy.xy = 0 THEN mx ELSE my END AS mag,
        |    CASE WHEN xy.xy = 0 THEN sx ELSE sy END AS s
        |  FROM pp, unnest(generate_series(0, 1)) AS xy(xy)
        |  UNION ALL
        |  SELECT q.doc_id, q.f, q.gr, q.ch,
        |    2*a.npairs + 4*q.q + (q.j - 1), q.mag, q.s
        |  FROM qq q JOIN par a USING (doc_id, f, gr, ch)),
        |-- long-block band table (44.1 kHz) out to line 90: ch0's coded
        |-- region never passes line 72 (14 pairs + 11 quads)
        |bands AS (SELECT * FROM (VALUES (0, 0, 4), (1, 4, 8), (2, 8, 12),
        |    (3, 12, 16), (4, 16, 20), (5, 20, 24), (6, 24, 30), (7, 30, 36),
        |    (8, 36, 44), (9, 44, 52), (10, 52, 62), (11, 62, 74),
        |    (12, 74, 90)) AS t(band, st, en)),
        |-- the intensity bound: ch1's last coded nonzero line + 1,
        |-- rounded UP to the next band boundary
        |rz AS (
        |  SELECT doc_id, f, gr,
        |    coalesce(max(CASE WHEN ch = 1 AND mag = 1 THEN line END) + 1, 0)
        |      AS rzero
        |  FROM lines GROUP BY doc_id, f, gr),
        |bnd AS (
        |  SELECT doc_id, f, gr, min(st) AS bound
        |  FROM rz JOIN bands ON st >= rzero
        |  GROUP BY doc_id, f, gr),
        |-- route every coded line to its OUTPUT channel: ch1 lines stay
        |-- right (always below the bound by construction); ch0 lines in
        |-- an intensity band pan by is_pos, else stay left
        |routed AS (
        |  SELECT l.doc_id, l.f, l.gr, l.line, l.s,
        |    CASE
        |      WHEN l.ch = 1 THEN 1
        |      WHEN b.st < bd.bound THEN 0
        |      WHEN b.band < 11 THEN 1
        |      WHEN (l.doc_id + 1000003 + b.band + l.f + l.gr) % 3 = 0 THEN 1
        |      ELSE 0 END AS out_ch,
        |    CAST(power(2, a.g) AS BIGINT) AS unit
        |  FROM lines l
        |  JOIN par a USING (doc_id, f, gr, ch)
        |  JOIN bands b ON l.line >= b.st AND l.line < b.en
        |  JOIN bnd bd ON bd.doc_id = l.doc_id AND bd.f = l.f AND bd.gr = l.gr
        |  WHERE l.mag = 1),
        |feat AS (
        |  SELECT doc_id, f, gr, out_ch,
        |    CAST(count(*) AS BIGINT) AS nnz,
        |    CAST(sum(unit) * 1000000 AS BIGINT) AS sum_abs,
        |    CAST(sum((1 - 2*s) * (line + 1) * unit) * 1000000 AS BIGINT)
        |      AS wsum
        |  FROM routed GROUP BY doc_id, f, gr, out_ch),
        |pbits AS (SELECT doc_id, f, gr, ch,
        |    sum(CASE WHEN mx = 0 AND my = 0 THEN 1
        |             WHEN mx = 1 AND my = 0 THEN 2 ELSE 3 END + mx + my) AS b
        |  FROM pp GROUP BY doc_id, f, gr, ch),
        |qbits AS (SELECT doc_id, f, gr, ch, sum(1 + mag) AS b
        |  FROM qq GROUP BY doc_id, f, gr, ch)
        |SELECT a.doc_id AS media_id,
        |  CAST(a.f AS BIGINT) AS frame_idx,
        |  CAST(a.gr AS BIGINT) AS granule,
        |  CAST(a.ch AS BIGINT) AS channel,
        |  CAST(a.npairs AS BIGINT) AS big_values,
        |  CAST(210 + 4*a.g AS BIGINT) AS global_gain,
        |  CAST(pb.b + qb.b + CASE a.ch WHEN 1 THEN 30 ELSE 0 END AS BIGINT)
        |    AS part2_3_length,
        |  coalesce(ft.nnz, 0) AS n_nonzero,
        |  coalesce(ft.sum_abs, 0) AS sum_abs_micro,
        |  coalesce(ft.wsum, 0) AS checksum_micro
        |FROM par a
        |JOIN pbits pb USING (doc_id, f, gr, ch)
        |JOIN qbits qb USING (doc_id, f, gr, ch)
        |LEFT JOIN feat ft ON ft.doc_id = a.doc_id AND ft.f = a.f
        |  AND ft.gr = a.gr AND ft.out_ch = a.ch
        |ORDER BY media_id, frame_idx, granule, channel""".stripMargin) { (s, dir) =>
      graft.multimodal.Multimodal.extractMp3Spectra(
        graft.multimodal.Multimodal.synthesizeMp3CodedIntensity(
          Tables.load(s, dir, "documents"), "doc_id"))
        .orderBy("media_id", "frame_idx", "granule", "channel")
    })
}
