package graft.multimodal

/** MPEG-1 Layer III (MP3) DECODER — header walk, side-info parse, bit
  * reservoir, scalefactor decode, Huffman coefficient decode,
  * requantization, alias reduction, and the 36-point IMDCT with
  * overlap-add to the 32-SUBBAND time domain (ISO/IEC 11172-3 §2.4).
  * The companion of [[MpegAudioSniff]] (which only hops headers): this
  * module reads the payload the sniff skips. [[Warc]]-scale honesty
  * notes, in decreasing order of coverage:
  *
  *  - Fully implemented: MPEG-1 Layer III mono/stereo/dual-channel
  *    frames, long blocks (block_type 0), START/STOP transient-bracket
  *    blocks (types 1/3 — window-switching side info, long band
  *    layout, their own IMDCT windows, mixed_block_flag honored as the
  *    §2.4.1.7 window split: subbands 0–1 normal-windowed, the rest
  *    per block_type), SHORT blocks (type 2 — subblock gains, short
  *    scalefactor layout, Huffman→natural reorder) including MIXED
  *    blocks (the hybrid split: lowest two subbands long, short bands
  *    3+ above, the 17+18 scalefactor layout), MS joint stereo
  *    (L = (M±S)/√2), INTENSITY joint stereo (pan by is_pos with the
  *    tan(is_pos·π/12) ratio, illegal position 7 passed through) over
  *    long AND short granules (short: a per-WINDOW bound search with
  *    per-window is_pos slots), the COMBINED joint stereo
  *    (mode_extension 3 — MS below the intensity bound, intensity pan
  *    at/above it, illegal positions falling back to MS per
  *    §2.4.3.4.9.3; long AND short granules, the short variant with
  *    per-window bounds over an MS default), the bit reservoir
  *    (main_data_begin),
  *    scalefactor decode incl. scfsi sharing, Huffman big_values PAIR
  *    decode for tables 0/1 and count1 QUAD decode for table B, sign
  *    bits, requantization (the |is|^(4/3) · 2^((gain−210)/4) ·
  *    scalefactor chain, StrictMath — bit-deterministic on any JVM),
  *    alias-reduction butterflies, IMDCT + per-type window +
  *    overlap-add + frequency inversion.
  *  - Typed rejection (never silent): Layer I/II, MPEG-2/2.5,
  *    free-format, joint stereo (intensity or combined) over
  *    MIXED-block or type-mismatched granules, and Huffman tables
  *    whose SPEC DATA is not embedded here (the large pair tables 2–31
  *    and count1 table A are hundreds of arbitrary codewords from ISO
  *    Table B.7 — reproducing them from memory would risk a silently
  *    non-conformant decoder, the worst failure shape; the embedded
  *    tables 0/1/B are small enough to verify by prefix-freeness +
  *    Kraft equality in the spec).
  *  - The FINAL polyphase synthesis to PCM needs the 512-coefficient
  *    window of ISO Table B.3 — numerically designed data with no
  *    generating formula — so [[decodeSubbands]] is the last honest
  *    stage: per-granule 32×18 subband-time samples (frequency-banded
  *    audio, the domain band-energy features live in anyway).
  *
  * Oracle strategy (the FLAC/JPEG-progressive discipline): the
  * synthesizer crafts streams whose spectral lines are ±1, global_gain
  * ≡ 210 (mod 4), and scalefactors zero — every requantized line is
  * EXACTLY ±2^g, so spectral features are integers a SQL oracle replays
  * closed-form from the bit recipe (q355/q356). Time-domain stages are
  * spec-gated against an independent direct-cosine reference.
  */
object Mp3Codec {

  // -------------------------------------------------------------- header

  final case class FrameHeader(
      bitrateKbps: Int,
      sampleRate: Int,
      channels: Int,
      padding: Int,
      hasCrc: Boolean,
      msStereo: Boolean,
      intensityStereo: Boolean,
      frameLength: Int)

  /** Parse and validate one 4-byte header at `off` — MPEG-1 Layer III
    * only; free-format and reserved fields rejected typed. All four
    * channel modes decode, and ALL FOUR joint-stereo mode_extensions:
    * 0 (none), 1 (intensity), 2 (MS), and the COMBINED 3 — the
    * mode_extension bits are independent flags (ISO 11172-3 §2.4.1.7:
    * bit 0 = intensity_stereo on, bit 1 = ms_stereo on), so 3 turns
    * both reconstructions on, split at the intensity bound.
    */
  def parseHeader(bytes: Array[Byte], off: Int): FrameHeader = {
    require(off + 4 <= bytes.length, "mp3: truncated frame header")
    val b1 = bytes(off) & 0xFF; val b2 = bytes(off + 1) & 0xFF
    val b3 = bytes(off + 2) & 0xFF; val b4 = bytes(off + 3) & 0xFF
    require(b1 == 0xFF && (b2 & 0xE0) == 0xE0, "mp3: bad frame sync")
    require(((b2 >> 3) & 3) == 3, "mp3: not MPEG-1 (MPEG-2/2.5 unsupported)")
    require(((b2 >> 1) & 3) == 1, "mp3: not Layer III (layers I/II unsupported)")
    val bIdx = (b3 >> 4) & 0xF
    require(bIdx >= 1 && bIdx <= 14, s"mp3: free-format/bad bitrate index $bIdx")
    val srIdx = (b3 >> 2) & 3
    require(srIdx <= 2, "mp3: reserved sample-rate index")
    val mode = (b4 >> 6) & 3
    val modeExt = (b4 >> 4) & 3
    val kbps = MpegAudioSniff.BitrateKbps(bIdx)
    val sr = MpegAudioSniff.SampleRateHz(srIdx)
    val pad = (b3 >> 1) & 1
    FrameHeader(kbps, sr, if (mode == 3) 1 else 2, pad,
      hasCrc = (b2 & 1) == 0, msStereo = mode == 1 && (modeExt & 2) != 0,
      intensityStereo = mode == 1 && (modeExt & 1) != 0,
      frameLength = MpegAudioSniff.frameLength(kbps, sr, pad))
  }

  // ---------------------------------------------------------- bit reader

  /** MSB-first bit reader with an exact position counter (part2_3_length
    * accounting is the framing contract).
    */
  final class BitReader(bytes: Array[Byte], startBit: Long) {
    var pos: Long = startBit
    def bits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) {
        val byteIdx = (pos >> 3).toInt
        require(byteIdx < bytes.length, "mp3: bitstream ran dry")
        v = (v << 1) | ((bytes(byteIdx) >> (7 - (pos & 7)).toInt) & 1)
        pos += 1
        i += 1
      }
      v
    }
    def bit(): Int = bits(1)
  }

  // ------------------------------------------------------------ side info

  final case class GranuleInfo(
      part23Length: Int,
      bigValues: Int,
      globalGain: Int,
      scalefacCompress: Int,
      blockType: Int,
      tableSelect: Array[Int],
      region0Count: Int,
      region1Count: Int,
      preflag: Int,
      scalefacScale: Int,
      count1Table: Int,
      subblockGain: Array[Int] = Array(0, 0, 0),
      mixed: Int = 0)

  final case class SideInfo(
      mainDataBegin: Int,
      scfsi: Array[Array[Int]], // [channel][band group 0..3]
      granules: Array[Array[GranuleInfo]]) // [granule][channel]

  /** Parse the MPEG-1 side info (17 bytes mono / 32 stereo) following
    * the header (+CRC when present). Long blocks only — a
    * window-switching granule (short/mixed blocks) rejects typed.
    */
  def parseSideInfo(bytes: Array[Byte], off: Int, channels: Int): SideInfo = {
    val br = new BitReader(bytes, off * 8L)
    val mainDataBegin = br.bits(9)
    br.bits(if (channels == 1) 5 else 3) // private bits
    val scfsi = Array.fill(channels)(Array.fill(4)(br.bit()))
    val granules = Array.tabulate(2) { _ =>
      Array.tabulate(channels) { _ =>
        val p23 = br.bits(12)
        val bv = br.bits(9)
        val gg = br.bits(8)
        val sfc = br.bits(4)
        val windowSwitching = br.bit()
        if (windowSwitching == 0) {
          val ts = Array.fill(3)(br.bits(5))
          val r0 = br.bits(4)
          val r1 = br.bits(3)
          val pre = br.bit()
          val sfs = br.bit()
          val c1t = br.bit()
          GranuleInfo(p23, bv, gg, sfc, blockType = 0, ts, r0, r1, pre, sfs, c1t)
        } else {
          // window-switching layout: block_type(2), mixed(1),
          // table_select×2, subblock_gain×3. SHORT (type 2, mixed or
          // not) and START/STOP long types (1/3, mixed or not) decode;
          // block_type 0 with window_switching set is a forbidden
          // combination per ISO §2.4.1.7. A mixed flag on types 1/3
          // changes ONLY the window routing (§2.4.1.7: the two lowest
          // subbands transform with the NORMAL window, the rest with
          // the block_type's) — the scalefactor layout stays the long
          // 21-band one and no reorder applies, because §2.4.2.7's
          // short/mixed scalefactor partitions are defined for
          // block_type 2 alone.
          val bt = br.bits(2)
          val mixed = br.bit()
          require(bt != 0, "mp3: window_switching with block_type 0 is forbidden")
          val ts = Array.fill(2)(br.bits(5))
          val sbg = Array.fill(3)(br.bits(3))
          val pre = br.bit()
          val sfs = br.bit()
          val c1t = br.bit()
          // implicit regions (ISO §2.4.2.7): region0_count is 8 for
          // short non-mixed, 7 for start/stop AND mixed; region1 covers
          // the rest of big_values
          GranuleInfo(p23, bv, gg, sfc, blockType = bt,
            Array(ts(0), ts(1), ts(1)),
            region0Count = if (bt == 2 && mixed == 0) 8 else 7,
            region1Count = 36,
            pre, sfs, c1t, subblockGain = sbg, mixed = mixed)
        }
      }
    }
    SideInfo(mainDataBegin, scfsi, granules)
  }

  /** Side-info length in bytes (MPEG-1). */
  def sideInfoLength(channels: Int): Int = if (channels == 1) 17 else 32

  // ------------------------------------------------------------- huffman

  /** ISO 11172-3 Table B.7, Huffman table 1 (x, y ∈ {0, 1}):
    * (0,0)→"1", (1,0)→"01", (0,1)→"001", (1,1)→"000". Verified
    * prefix-free with Kraft sum exactly 1 in the spec suite.
    */
  private def decodePairTable1(br: BitReader): (Int, Int) =
    if (br.bit() == 1) (0, 0)
    else if (br.bit() == 1) (1, 0)
    else if (br.bit() == 1) (0, 1)
    else (1, 1)

  /** Code length of table 1's (x, y) — the synthesizer/oracle twin of
    * [[decodePairTable1]].
    */
  def pairTable1Len(x: Int, y: Int): Int =
    if (x == 0 && y == 0) 1 else if (x == 1 && y == 0) 2 else 3

  def pairTable1Code(x: Int, y: Int): (Int, Int) = (x, y) match {
    case (0, 0) => (1, 1) // bits "1"
    case (1, 0) => (1, 2) // "01"
    case (0, 1) => (1, 3) // "001"
    case _ => (0, 3) // "000"
  }

  /** count1 Table B: every quad (v,w,x,y) is coded in exactly 4 bits as
    * the ONE'S COMPLEMENT of its value bits (quad 0000 → "1111").
    * Fixed-length, trivially prefix-free.
    */
  private def decodeQuadTableB(br: BitReader): (Int, Int, Int, Int) = {
    val c = (~br.bits(4)) & 0xF
    ((c >> 3) & 1, (c >> 2) & 1, (c >> 1) & 1, c & 1)
  }

  // --------------------------------------------------------- scalefactors

  private val Slen1 = Array(0, 0, 0, 0, 3, 1, 1, 1, 2, 2, 2, 3, 3, 3, 4, 4)
  private val Slen2 = Array(0, 1, 2, 3, 0, 1, 2, 3, 1, 2, 3, 1, 2, 3, 2, 3)

  /** Long-block scalefactor band START indices (22 boundaries, last =
    * 576), per MPEG-1 sample rate — ISO 11172-3 Annex B Table B.8.
    */
  val SfbLong: Map[Int, Array[Int]] = Map(
    44100 -> Array(0, 4, 8, 12, 16, 20, 24, 30, 36, 44, 52, 62, 74, 90,
      110, 134, 162, 196, 238, 288, 342, 418, 576),
    48000 -> Array(0, 4, 8, 12, 16, 20, 24, 30, 36, 42, 50, 60, 72, 88,
      106, 128, 156, 190, 230, 276, 330, 384, 576),
    32000 -> Array(0, 4, 8, 12, 16, 20, 24, 30, 36, 44, 54, 66, 84, 106,
      136, 170, 212, 264, 322, 392, 464, 576))

  private val Pretab =
    Array(0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 3, 3, 3, 2)

  /** SHORT-block scalefactor band START indices per window (14
    * boundaries, last = 192), per MPEG-1 sample rate — ISO 11172-3
    * Annex B Table B.8. Huffman order packs each band's three windows
    * consecutively; natural (subband-time) order interleaves them —
    * the reorder permutation below.
    */
  val SfbShort: Map[Int, Array[Int]] = Map(
    44100 -> Array(0, 4, 8, 12, 16, 22, 30, 40, 52, 66, 84, 106, 136, 192),
    48000 -> Array(0, 4, 8, 12, 16, 22, 28, 38, 50, 64, 80, 100, 126, 192),
    32000 -> Array(0, 4, 8, 12, 16, 22, 30, 42, 58, 78, 104, 138, 180, 192))

  /** Decode the 21 long-block scalefactors for one granule/channel;
    * granule 1 copies scfsi-shared groups from granule 0 (groups:
    * 0–5, 6–10, 11–15, 16–20).
    */
  private def decodeScalefactors(
      br: BitReader, gi: GranuleInfo, granule: Int,
      scfsi: Array[Int], prev: Array[Int]): Array[Int] = {
    val s1 = Slen1(gi.scalefacCompress)
    val s2 = Slen2(gi.scalefacCompress)
    if (gi.blockType == 2 && gi.mixed == 1) {
      // MIXED layout (ISO §2.4.2.7): 8 LONG scalefactors (bands 0–7,
      // the first 36 lines / 2 subbands) then SHORT bands 3–11 × 3
      // windows; slen1 covers the 8 long + short 3–5 (17 groups),
      // slen2 short 6–11 (18 groups). One 36-slot array: long sfs at
      // [0..7], short sfs at sfb·3 + window ∈ [9..35] — disjoint, so
      // the long and short requantize chains index the same array.
      val out = new Array[Int](36)
      var b = 0
      while (b < 8) {
        out(b) = if (s1 == 0) 0 else br.bits(s1)
        b += 1
      }
      var sfb = 3
      while (sfb < 12) {
        val slen = if (sfb < 6) s1 else s2
        var w = 0
        while (w < 3) {
          out(sfb * 3 + w) = if (slen == 0) 0 else br.bits(slen)
          w += 1
        }
        sfb += 1
      }
      return out
    }
    if (gi.blockType == 2) {
      // short: 12 sfbs × 3 windows, sfb-major (sfb·3 + window); slen1
      // for sfbs 0–5, slen2 for 6–11; scfsi never applies to short
      val out = new Array[Int](36)
      var sfb = 0
      while (sfb < 12) {
        val slen = if (sfb < 6) s1 else s2
        var w = 0
        while (w < 3) {
          out(sfb * 3 + w) = if (slen == 0) 0 else br.bits(slen)
          w += 1
        }
        sfb += 1
      }
      return out
    }
    val out = new Array[Int](21)
    val groups = Seq((0, 6, s1), (6, 11, s1), (11, 16, s2), (16, 21, s2))
    groups.zipWithIndex.foreach { case ((from, until, slen), gidx) =>
      if (granule == 1 && scfsi(gidx) == 1) {
        var b = from
        while (b < until) { out(b) = prev(b); b += 1 }
      } else {
        var b = from
        while (b < until) { out(b) = if (slen == 0) 0 else br.bits(slen); b += 1 }
      }
    }
    out
  }

  // --------------------------------------------------------- granule data

  final case class GranuleDecode(
      frameIdx: Int,
      granule: Int,
      channel: Int,
      info: GranuleInfo,
      scalefactors: Array[Int],
      is: Array[Int], // 576 Huffman-decoded integer lines
      xr: Array[Double]) // 576 requantized lines

  /** Huffman-decode one granule's 576 integer lines. Table selection per
    * region; only tables 0/1 (pairs) and B (count1) carry embedded data —
    * any other selection rejects typed.
    */
  private def decodeLines(
      br: BitReader, gi: GranuleInfo, part2End: Long,
      sampleRate: Int): Array[Int] = {
    val is = new Array[Int](576)
    var line = 0
    // big_values pairs — region boundaries only pick the TABLE; validate
    // each region's selection
    gi.tableSelect.foreach(t => require(t == 0 || t == 1,
      s"mp3: Huffman pair table $t not embedded (tables 0/1 only)"))
    require(gi.count1Table == 1,
      "mp3: count1 table A not embedded (table B only)")
    val (region0End, region1End) =
      if (gi.blockType == 2) (36, 576) // implicit short-block regions
      else {
        // region boundaries come from the STREAM's sample-rate band table
        // (tables differ from index 9 up; 44.1 kHz here would mispick the
        // Huffman table near a boundary on a 48/32 kHz stream)
        val sfb = SfbLong(sampleRate)
        (sfb(math.min(gi.region0Count + 1, 22)),
          sfb(math.min(gi.region0Count + 1 + gi.region1Count + 1, 22)))
      }
    var pair = 0
    while (pair < gi.bigValues) {
      val t =
        if (line < region0End) gi.tableSelect(0)
        else if (line < region1End) gi.tableSelect(1)
        else gi.tableSelect(2)
      val (mx, my) = if (t == 0) (0, 0) else decodePairTable1(br)
      val x = if (mx != 0 && br.bit() == 1) -mx else mx
      val y = if (my != 0 && br.bit() == 1) -my else my
      require(line + 1 < 576, "mp3: big_values overruns 576 lines")
      is(line) = x; is(line + 1) = y
      line += 2
      pair += 1
    }
    // count1 quads until the granule's bit budget is exhausted
    while (br.pos < part2End && line + 3 < 576) {
      val (v, w, x, y) = decodeQuadTableB(br)
      val vs = if (v != 0 && br.bit() == 1) -v else v
      val ws = if (w != 0 && br.bit() == 1) -w else w
      val xs = if (x != 0 && br.bit() == 1) -x else x
      val ys = if (y != 0 && br.bit() == 1) -y else y
      is(line) = vs; is(line + 1) = ws; is(line + 2) = xs; is(line + 3) = ys
      line += 4
    }
    require(br.pos <= part2End,
      "mp3: Huffman data overran part2_3_length (corrupt stream)")
    is
  }

  /** Requantize: xr[i] = sign(is) · |is|^(4/3) · 2^((global_gain−210)/4)
    * · 2^(−(scalefac_scale+1)/2 · (scalefac[sfb] + preflag·pretab[sfb])).
    * StrictMath throughout — bit-identical on every JVM.
    */
  private def requantize(
      is: Array[Int], gi: GranuleInfo, scalefacs: Array[Int],
      sampleRate: Int): Array[Double] = {
    val sfb = SfbLong(sampleRate)
    val xr = new Array[Double](576)
    val gain = StrictMath.pow(2.0, (gi.globalGain - 210) / 4.0)
    val sfMult = if (gi.scalefacScale == 1) 1.0 else 0.5
    var band = 0
    var i = 0
    while (i < 576) {
      while (band < 21 && i >= sfb(band + 1)) band += 1
      // lines at or beyond sfb index 21 have NO scalefactor (ISO 11172-3
      // §2.4.3.4.7.1 defines 21 long scalefactors); they scale with sf=0
      val sf =
        if (band >= 21) 0
        else scalefacs(band) + (if (gi.preflag == 1) Pretab(band) else 0)
      val scale = gain * StrictMath.pow(2.0, -sfMult * sf)
      val v = is(i)
      xr(i) =
        if (v == 0) 0.0
        else StrictMath.signum(v.toDouble) *
          StrictMath.pow(StrictMath.abs(v.toDouble), 4.0 / 3.0) * scale
      i += 1
    }
    xr
  }

  /** SHORT-block requantize + REORDER in one pass. Huffman order packs
    * lines (sfb, window, idx-in-band); natural subband-time order is
    * 3·(start + idx) + window. Requantization adds the per-window
    * subblock gain 2^(−2·subblock_gain[w]) and drops the pretab (long
    * blocks only, per spec). Returns the NATURAL-order spectrum.
    */
  private def requantizeShort(
      is: Array[Int], gi: GranuleInfo, scalefacs: Array[Int],
      sampleRate: Int): Array[Double] = {
    val sfb = SfbShort(sampleRate)
    val xr = new Array[Double](576)
    val gain = StrictMath.pow(2.0, (gi.globalGain - 210) / 4.0)
    val sfMult = if (gi.scalefacScale == 1) 1.0 else 0.5
    var band = 0
    var i = 0
    while (i < 576) {
      while (band < 12 && i >= 3 * sfb(band + 1)) band += 1
      val b = math.min(band, 12) // lines past 3·136 ride the last band's frame
      val start = sfb(b)
      val width = sfb(b + 1) - sfb(b)
      val k = i - 3 * start
      val w = k / width
      val idx = k % width
      val v = is(i)
      if (v != 0) {
        val sf = if (b < 12) scalefacs(b * 3 + w) else 0
        val scale = gain *
          StrictMath.pow(2.0, -2.0 * gi.subblockGain(w)) *
          StrictMath.pow(2.0, -sfMult * sf)
        xr(3 * (start + idx) + w) = StrictMath.signum(v.toDouble) *
          StrictMath.pow(StrictMath.abs(v.toDouble), 4.0 / 3.0) * scale
      }
      i += 1
    }
    xr
  }

  /** MIXED-block requantize: the hybrid band split — lines 0–35 (the
    * lowest two subbands) are LONG-windowed and requantize through the
    * long chain over long bands 0–7 (no subblock gain); lines 36+ are
    * short-windowed and requantize + REORDER through the short chain
    * from short band 3 up (3·sfbShort(3) = 36 at every MPEG-1 rate).
    * `scalefacs` is the 36-slot mixed array ([[decodeScalefactors]]).
    * Returns the NATURAL-order spectrum.
    */
  private def requantizeMixed(
      is: Array[Int], gi: GranuleInfo, scalefacs: Array[Int],
      sampleRate: Int): Array[Double] = {
    val xr = new Array[Double](576)
    val gain = StrictMath.pow(2.0, (gi.globalGain - 210) / 4.0)
    val sfMult = if (gi.scalefacScale == 1) 1.0 else 0.5
    // long part: identity order, bands 0–7 (pretab is zero there, but
    // apply it for spec fidelity)
    val sfbL = SfbLong(sampleRate)
    var band = 0
    var i = 0
    while (i < 36) {
      while (band < 7 && i >= sfbL(band + 1)) band += 1
      val sf = scalefacs(band) + (if (gi.preflag == 1) Pretab(band) else 0)
      val v = is(i)
      if (v != 0)
        xr(i) = StrictMath.signum(v.toDouble) *
          StrictMath.pow(StrictMath.abs(v.toDouble), 4.0 / 3.0) *
          gain * StrictMath.pow(2.0, -sfMult * sf)
      i += 1
    }
    // short part: reorder from band 3 up, per-window subblock gains
    val sfbS = SfbShort(sampleRate)
    var b = 3
    while (i < 576) {
      while (b < 12 && i >= 3 * sfbS(b + 1)) b += 1
      val bb = math.min(b, 12)
      val start = sfbS(bb)
      val width = sfbS(bb + 1) - sfbS(bb)
      val k = i - 3 * start
      val w = k / width
      val idx = k % width
      val v = is(i)
      if (v != 0) {
        val sf = if (bb < 12) scalefacs(bb * 3 + w) else 0
        xr(3 * (start + idx) + w) = StrictMath.signum(v.toDouble) *
          StrictMath.pow(StrictMath.abs(v.toDouble), 4.0 / 3.0) *
          gain * StrictMath.pow(2.0, -2.0 * gi.subblockGain(w)) *
          StrictMath.pow(2.0, -sfMult * sf)
      }
      i += 1
    }
    xr
  }

  // ------------------------------------------------------------- decode

  /** Decode every granule of every frame to requantized spectra — the
    * oracle-gated surface. Handles the bit reservoir: each frame's main
    * data may begin `main_data_begin` bytes BACK into the previous
    * frames' payload.
    */
  def decodeSpectra(bytes: Array[Byte]): Seq[GranuleDecode] = {
    var p = 0
    // tolerate a leading ID3v2 like the sniff
    if (bytes.length >= 10 && bytes(0) == 'I' && bytes(1) == 'D' && bytes(2) == '3') {
      val size = ((bytes(6) & 0x7f) << 21) | ((bytes(7) & 0x7f) << 14) |
        ((bytes(8) & 0x7f) << 7) | (bytes(9) & 0x7f)
      p = 10 + size
      require(p <= bytes.length, "mp3: ID3v2 tag overruns stream")
    }
    val out = Seq.newBuilder[GranuleDecode]
    val reservoir = new java.io.ByteArrayOutputStream()
    var frameIdx = 0
    while (p < bytes.length &&
      !(bytes.length - p == 128 && bytes(p) == 'T' && bytes(p + 1) == 'A' &&
        bytes(p + 2) == 'G')) {
      val h = parseHeader(bytes, p)
      require(p + h.frameLength <= bytes.length, "mp3: frame overruns stream")
      val siOff = p + 4 + (if (h.hasCrc) 2 else 0)
      val si = parseSideInfo(bytes, siOff, h.channels)
      val mainOff = siOff + sideInfoLength(h.channels)
      val thisMain = java.util.Arrays.copyOfRange(bytes, mainOff, p + h.frameLength)
      val res = reservoir.toByteArray
      require(si.mainDataBegin <= res.length,
        s"mp3: main_data_begin ${si.mainDataBegin} exceeds reservoir ${res.length}")
      val main = java.util.Arrays.copyOfRange(
        res, res.length - si.mainDataBegin, res.length) ++ thisMain
      val br = new BitReader(main, 0L)
      val prevSf = Array.fill(h.channels)(new Array[Int](21))
      for (gr <- 0 until 2) {
        val decoded = (0 until h.channels).map { ch =>
          val gi = si.granules(gr)(ch)
          val start = br.pos
          val end = start + gi.part23Length
          val sf = decodeScalefactors(br, gi, gr, si.scfsi(ch), prevSf(ch))
          if (gr == 0) System.arraycopy(sf, 0, prevSf(ch), 0, 21)
          val is = decodeLines(br, gi, end, h.sampleRate)
          br.pos = end // stuffing bits after the coefficient data are legal
          GranuleDecode(frameIdx, gr, ch, gi, sf, is,
            if (gi.blockType == 2 && gi.mixed == 1)
              requantizeMixed(is, gi, sf, h.sampleRate)
            else if (gi.blockType == 2) requantizeShort(is, gi, sf, h.sampleRate)
            else requantize(is, gi, sf, h.sampleRate))
        }
        if (h.msStereo && h.intensityStereo) {
          // COMBINED joint stereo (mode_extension 3, ISO 11172-3
          // §2.4.3.4.9.3): intensity governs every scalefactor band
          // lying entirely at/above the intensity bound (channel 1's
          // last coded line rounded up to a band boundary); everything
          // BELOW the bound reconstructs in MS. A band in the
          // intensity region whose is_pos is the ILLEGAL 7 falls back
          // to MS (the spec's illegal-position rule when ms_stereo is
          // on — not pass-through as in pure intensity), and so does
          // the zone above sfb 20, which carries no is_pos at all.
          // SHORT-block granules take the per-window variant below:
          // MS is the DEFAULT everywhere (below each window's bound,
          // illegal positions, the no-is_pos band-12 zone) and
          // intensity bands overwrite it with the pan.
          if (decoded.exists(_.info.blockType == 2)) {
            require(decoded.forall(g => g.info.blockType == 2 && g.info.mixed == 0),
              "mp3: combined stereo with mixed or mismatched block types unsupported")
            val sfbS = SfbShort(h.sampleRate)
            val m = decoded(0).xr; val sCh = decoded(1).xr
            val sqrt2 = StrictMath.sqrt(2.0)
            val xl = new Array[Double](576); val xrr = new Array[Double](576)
            var i = 0
            while (i < 576) {
              xl(i) = (m(i) + sCh(i)) / sqrt2
              xrr(i) = (m(i) - sCh(i)) / sqrt2
              i += 1
            }
            var w = 0
            while (w < 3) {
              var boundBand = 0
              var b = 11
              while (b >= 0 && boundBand == 0) {
                val st = sfbS(b); val width = sfbS(b + 1) - st
                var idx = 0
                while (idx < width && boundBand == 0) {
                  if (sCh(3 * (st + idx) + w) != 0.0) boundBand = b + 1
                  idx += 1
                }
                b -= 1
              }
              var bb = boundBand
              while (bb < 12) {
                val isPos = decoded(1).scalefactors(bb * 3 + w)
                if (isPos != 7) { // 7 keeps the MS default
                  val st = sfbS(bb); val width = sfbS(bb + 1) - st
                  var idx = 0
                  while (idx < width) {
                    val i2 = 3 * (st + idx) + w
                    val v = m(i2)
                    if (isPos == 6) { xl(i2) = v; xrr(i2) = 0.0 } // r → ∞
                    else if (isPos == 0) { xl(i2) = 0.0; xrr(i2) = v } // r = 0
                    else {
                      val r = StrictMath.tan(isPos * StrictMath.PI / 12.0)
                      xl(i2) = v * (r / (1.0 + r))
                      xrr(i2) = v * (1.0 / (1.0 + r))
                    }
                    idx += 1
                  }
                }
                bb += 1
              }
              w += 1
            }
            out += decoded(0).copy(xr = xl)
            out += decoded(1).copy(xr = xrr)
          } else {
          val sfb = SfbLong(h.sampleRate)
          val rIs = decoded(1).is
          var rzero = 576
          while (rzero > 0 && rIs(rzero - 1) == 0) rzero -= 1
          val m = decoded(0).xr; val sCh = decoded(1).xr
          val sqrt2 = StrictMath.sqrt(2.0)
          val xl = new Array[Double](576); val xrr = new Array[Double](576)
          var band = 0
          var i = 0
          while (i < 576) {
            while (band < 21 && i >= sfb(band + 1)) band += 1
            val isPos =
              if (band < 21 && sfb(band) >= rzero)
                decoded(1).scalefactors(band)
              else 7 // below the bound / above sfb 20: MS region
            if (isPos != 7) {
              val v = m(i)
              if (isPos == 6) { xl(i) = v; xrr(i) = 0.0 } // r → ∞
              else if (isPos == 0) { xl(i) = 0.0; xrr(i) = v } // r = 0
              else {
                val r = StrictMath.tan(isPos * StrictMath.PI / 12.0)
                xl(i) = v * (r / (1.0 + r))
                xrr(i) = v * (1.0 / (1.0 + r))
              }
            } else {
              xl(i) = (m(i) + sCh(i)) / sqrt2
              xrr(i) = (m(i) - sCh(i)) / sqrt2
            }
            i += 1
          }
          out += decoded(0).copy(xr = xl)
          out += decoded(1).copy(xr = xrr)
          }
        } else if (h.msStereo) {
          // MS reconstruction (ISO 11172-3 §2.4.3.4.9.2): channel 0
          // carries MID, channel 1 SIDE — L = (M+S)/√2, R = (M−S)/√2,
          // applied on the requantized spectra before any time-domain
          // stage. The integer `is` lines stay per-CODED-channel.
          val m = decoded(0).xr; val s = decoded(1).xr
          val sqrt2 = StrictMath.sqrt(2.0)
          val l = new Array[Double](576); val r2 = new Array[Double](576)
          var j = 0
          while (j < 576) {
            l(j) = (m(j) + s(j)) / sqrt2
            r2(j) = (m(j) - s(j)) / sqrt2
            j += 1
          }
          out += decoded(0).copy(xr = l)
          out += decoded(1).copy(xr = r2)
        } else if (h.intensityStereo) {
          // INTENSITY reconstruction (ISO 11172-3 §2.4.3.4.9.3): the
          // right channel's upper spectrum is not transmitted; instead
          // its scalefactors there carry stereo POSITIONS is_pos, and
          // both channels rebuild from the left channel's lines with
          // ratio r = tan(is_pos·π/12): L = v·r/(1+r), R = v/(1+r).
          // The intensity region is every scalefactor band lying
          // entirely at/above the right channel's last coded line
          // (rounded up to a band boundary); is_pos 7 is the ILLEGAL
          // position — that band passes through untouched. The zone
          // above sfb 20 carries no scalefactor hence no is_pos; both
          // channels' lines there are beyond the coded region of any
          // conformant intensity stream, so pass-through is
          // output-equivalent and that is what this decoder does.
          // SHORT-block granules take the per-window variant below.
          if (decoded.exists(_.info.blockType == 2)) {
            require(decoded.forall(g => g.info.blockType == 2 && g.info.mixed == 0),
              "mp3: intensity stereo with mixed or mismatched block types unsupported")
            // SHORT-BLOCK intensity (ISO 11172-3 §2.4.3.4.9.3, the
            // reference decoder's window scan): each of the three
            // short windows gets its OWN bound — the highest band
            // holding a nonzero right-channel line in that window,
            // plus one — and bands at/above it pan by that band's
            // per-window is_pos (scalefactor slot sfb·3 + w); illegal
            // position 7 passes through, and the no-is_pos band 12
            // (lines 3·136+) is beyond any conformant coded region so
            // it passes through like the long path's sfb-20 zone.
            // Natural-order line of (band b, window w, idx) is
            // 3·(start + idx) + w — the reorder permutation.
            val sfbS = SfbShort(h.sampleRate)
            val r1 = decoded(1).xr
            val xl = decoded(0).xr.clone(); val xrr = decoded(1).xr.clone()
            var w = 0
            while (w < 3) {
              var boundBand = 0
              var b = 11
              while (b >= 0 && boundBand == 0) {
                val st = sfbS(b); val width = sfbS(b + 1) - st
                var idx = 0
                while (idx < width && boundBand == 0) {
                  if (r1(3 * (st + idx) + w) != 0.0) boundBand = b + 1
                  idx += 1
                }
                b -= 1
              }
              var bb = boundBand
              while (bb < 12) {
                val isPos = decoded(1).scalefactors(bb * 3 + w)
                if (isPos != 7) {
                  val st = sfbS(bb); val width = sfbS(bb + 1) - st
                  var idx = 0
                  while (idx < width) {
                    val i = 3 * (st + idx) + w
                    val v = decoded(0).xr(i)
                    if (isPos == 6) { xl(i) = v; xrr(i) = 0.0 } // r → ∞
                    else if (isPos == 0) { xl(i) = 0.0; xrr(i) = v } // r = 0
                    else {
                      val r = StrictMath.tan(isPos * StrictMath.PI / 12.0)
                      xl(i) = v * (r / (1.0 + r))
                      xrr(i) = v * (1.0 / (1.0 + r))
                    }
                    idx += 1
                  }
                }
                bb += 1
              }
              w += 1
            }
            out += decoded(0).copy(xr = xl)
            out += decoded(1).copy(xr = xrr)
            // the long-block path below is skipped for this granule
          } else {
          val sfb = SfbLong(h.sampleRate)
          val rIs = decoded(1).is
          var rzero = 576
          while (rzero > 0 && rIs(rzero - 1) == 0) rzero -= 1
          val xl = decoded(0).xr.clone()
          val xrr = decoded(1).xr.clone()
          var band = 0
          while (band < 21) {
            if (sfb(band) >= rzero) {
              val isPos = decoded(1).scalefactors(band)
              if (isPos != 7) {
                var i = sfb(band)
                val end = sfb(band + 1)
                while (i < end) {
                  val v = xl(i)
                  if (isPos == 6) { xl(i) = v; xrr(i) = 0.0 } // r → ∞
                  else if (isPos == 0) { xl(i) = 0.0; xrr(i) = v } // r = 0
                  else {
                    val r = StrictMath.tan(isPos * StrictMath.PI / 12.0)
                    xl(i) = v * (r / (1.0 + r))
                    xrr(i) = v * (1.0 / (1.0 + r))
                  }
                  i += 1
                }
              }
            }
            band += 1
          }
          out += decoded(0).copy(xr = xl)
          out += decoded(1).copy(xr = xrr)
          }
        } else decoded.foreach(out += _)
      }
      // the reservoir carries ONLY main-data bytes (max 511 lookback)
      reservoir.reset()
      val keep = (res ++ thisMain)
      val from = math.max(0, keep.length - 511)
      reservoir.write(keep, from, keep.length - from)
      p += h.frameLength
      frameIdx += 1
    }
    val r = out.result()
    require(r.nonEmpty, "mp3: no frames decoded")
    r
  }

  // ----------------------------------------------------------- synthesize

  private final class BitWriter {
    private val out = new java.io.ByteArrayOutputStream()
    private var cur = 0
    private var nBits = 0
    def write(v: Int, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) {
        cur = (cur << 1) | ((v >> i) & 1)
        nBits += 1
        if (nBits == 8) { out.write(cur); cur = 0; nBits = 0 }
        i -= 1
      }
    }
    def padToByte(): Unit = if (nBits > 0) write(0, 8 - nBits)
    def bytes: Array[Byte] = { padToByte(); out.toByteArray }
    def bitLength: Long = out.size() * 8L + nBits
  }

  /** The q355/q356 bit recipe for (id, frame, granule): pair and quad
    * magnitudes/signs as pure mod-2 arithmetic on the indices — every
    * term replayable in SQL.
    */
  final case class GranuleRecipe(
      id: Long, f: Int, gr: Int, basePairs: Int = 4, baseQuads: Int = 3) {
    val nPairs: Int = basePairs + ((id + f) % 5).toInt
    val nQuads: Int = baseQuads + ((id + 2 * f + gr) % 4).toInt
    val gainExp: Int = ((id + f + gr) % 5).toInt // global_gain = 210 + 4·g
    def pairMag(p: Int): (Int, Int) = (
      ((id + 3 * gr + 7 * p + f) % 2).toInt,
      ((id * 5 + gr + 11 * p + 2 * f) % 2).toInt)
    def pairSign(p: Int): (Int, Int) = (
      ((id + p + f) % 2).toInt, ((id + p + gr) % 2).toInt)
    def quadMag(q: Int): Array[Int] = Array(
      ((id + q + f) % 2).toInt, ((id + 3 * q + gr) % 2).toInt,
      ((id + 5 * q + f + gr) % 2).toInt, ((id + 7 * q + 1) % 2).toInt)
    def quadSign(q: Int, j: Int): Int = ((id + q + j) % 2).toInt
    def part23Length: Int = {
      var bits = 0
      var p = 0
      while (p < nPairs) {
        val (x, y) = pairMag(p)
        bits += pairTable1Len(x, y) + x + y
        p += 1
      }
      var q = 0
      while (q < nQuads) {
        bits += 4 + quadMag(q).sum
        q += 1
      }
      bits
    }
  }

  /** Synthesize a deterministic FULLY-CODED Layer III stream for doc
    * `id`: `nFrames` mono 32 kbps 44.1 kHz frames, long blocks,
    * main_data_begin 0, zero scalefactors, Huffman data per
    * [[GranuleRecipe]] — spectral lines all ±1, global_gain ≡ 210
    * (mod 4), so every requantized line is EXACTLY ±2^g and the decode
    * is integer-replayable. This is a bit-WRITER for the recipe, not an
    * encoder: it shares no code with the decode path.
    */
  def synthesizeCoded(id: Long, nFrames: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val frameLen = MpegAudioSniff.frameLength(32, 44100, 0) // 104 bytes
    var f = 0
    while (f < nFrames) {
      // header: sync, MPEG-1, Layer III, no CRC, 32 kbps, 44.1 kHz, mono
      out.write(0xFF); out.write(0xFB); out.write(0x10); out.write(0xC0)
      val bw = new BitWriter
      bw.write(0, 9) // main_data_begin
      bw.write(0, 5) // private (mono)
      bw.write(0, 4) // scfsi
      for (gr <- 0 until 2) {
        val r = GranuleRecipe(id, f, gr)
        bw.write(r.part23Length, 12)
        bw.write(r.nPairs, 9) // big_values (pairs)
        bw.write(210 + 4 * r.gainExp, 8)
        bw.write(0, 4) // scalefac_compress → zero scalefactor bits
        bw.write(0, 1) // window_switching: long blocks
        bw.write(1, 5); bw.write(1, 5); bw.write(1, 5) // table_select 1,1,1
        bw.write(3, 4) // region0_count
        bw.write(3, 3) // region1_count
        bw.write(0, 1) // preflag
        bw.write(0, 1) // scalefac_scale
        bw.write(1, 1) // count1table_select → table B
      }
      val si = bw.bytes
      require(si.length == 17, s"side info must be 17 bytes, got ${si.length}")
      out.write(si, 0, 17)
      // main data: both granules' Huffman bits back to back, then padding
      val md = new BitWriter
      for (gr <- 0 until 2) {
        val r = GranuleRecipe(id, f, gr)
        var p = 0
        while (p < r.nPairs) {
          val (x, y) = r.pairMag(p)
          val (code, len) = pairTable1Code(x, y)
          md.write(code, len)
          val (sx, sy) = r.pairSign(p)
          if (x != 0) md.write(sx, 1)
          if (y != 0) md.write(sy, 1)
          p += 1
        }
        var q = 0
        while (q < r.nQuads) {
          val m = r.quadMag(q)
          md.write(~((m(0) << 3) | (m(1) << 2) | (m(2) << 1) | m(3)) & 0xF, 4)
          var j = 0
          while (j < 4) {
            if (m(j) != 0) md.write(r.quadSign(q, j + 1), 1)
            j += 1
          }
          q += 1
        }
      }
      val main = md.bytes
      val room = frameLen - 4 - 17
      require(main.length <= room, s"main data ${main.length} exceeds $room")
      out.write(main, 0, main.length)
      var pad = main.length
      while (pad < room) { out.write(0); pad += 1 }
      f += 1
    }
    out.toByteArray
  }

  /** SHORT-BLOCK twin of [[synthesizeCoded]]: mono frames whose
    * granules are window-switching block_type-2 (non-mixed) — the
    * transient shape every real encoder emits at attacks. Bigger
    * coefficient recipes (base 10 pairs / 8 quads) push lines past the
    * first four short bands so the reorder permutation crosses a WIDTH
    * CHANGE (band 4 is 6 wide at 44.1 kHz); per-window subblock gains
    * (id + f + gr + w) mod 3 make the requantized magnitude
    * 2^(g − 2·sbg[w]) — still exact dyadic, so the oracle replays
    * reorder AND window gains in integer micro units.
    */
  def synthesizeCodedShort(id: Long, nFrames: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val frameLen = MpegAudioSniff.frameLength(32, 44100, 0)
    var f = 0
    while (f < nFrames) {
      out.write(0xFF); out.write(0xFB); out.write(0x10); out.write(0xC0)
      val bw = new BitWriter
      bw.write(0, 9); bw.write(0, 5); bw.write(0, 4)
      for (gr <- 0 until 2) {
        val r = GranuleRecipe(id, f, gr, basePairs = 10, baseQuads = 8)
        bw.write(r.part23Length, 12)
        bw.write(r.nPairs, 9)
        bw.write(210 + 4 * r.gainExp, 8)
        bw.write(0, 4) // scalefac_compress
        bw.write(1, 1) // window_switching
        bw.write(2, 2) // block_type: short
        bw.write(0, 1) // mixed_block_flag
        bw.write(1, 5); bw.write(1, 5) // table_select × 2
        for (w <- 0 until 3) bw.write(((id + f + gr + w) % 3).toInt, 3)
        bw.write(0, 1) // preflag
        bw.write(0, 1) // scalefac_scale
        bw.write(1, 1) // count1table_select → table B
      }
      val si = bw.bytes
      require(si.length == 17, s"side info must be 17 bytes, got ${si.length}")
      out.write(si, 0, 17)
      val md = new BitWriter
      for (gr <- 0 until 2) {
        val r = GranuleRecipe(id, f, gr, basePairs = 10, baseQuads = 8)
        var p = 0
        while (p < r.nPairs) {
          val (x, y) = r.pairMag(p)
          val (code, len) = pairTable1Code(x, y)
          md.write(code, len)
          val (sx, sy) = r.pairSign(p)
          if (x != 0) md.write(sx, 1)
          if (y != 0) md.write(sy, 1)
          p += 1
        }
        var q = 0
        while (q < r.nQuads) {
          val m = r.quadMag(q)
          md.write(~((m(0) << 3) | (m(1) << 2) | (m(2) << 1) | m(3)) & 0xF, 4)
          var j = 0
          while (j < 4) {
            if (m(j) != 0) md.write(r.quadSign(q, j + 1), 1)
            j += 1
          }
          q += 1
        }
      }
      val main = md.bytes
      val room = frameLen - 4 - 17
      require(main.length <= room, s"main data ${main.length} exceeds $room")
      out.write(main, 0, main.length)
      var pad = main.length
      while (pad < room) { out.write(0); pad += 1 }
      f += 1
    }
    out.toByteArray
  }

  /** The SIDE channel's recipe id for [[synthesizeCodedMs]] — a fixed
    * prime offset so the two coded channels carry independent bit
    * patterns the oracle can replay separately.
    */
  val MsSideSeed: Long = 1000003L

  /** Stereo twin of [[synthesizeCoded]]: MS JOINT STEREO frames (mode
    * 01, mode_extension 10) — channel 0 carries the MID recipe for
    * `id`, channel 1 the SIDE recipe for `id + MsSideSeed`. Decode must
    * matrix L = (M+S)/√2, R = (M−S)/√2; with both coded spectra ±2^g
    * the matrixed lines are k·2^g/√2 — irrational but IEEE-exact, so
    * micro-rounded features replay in any engine that mirrors the
    * operation order.
    */
  def synthesizeCodedMs(
      id: Long, nFrames: Int, sideSeed: Long = MsSideSeed): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val frameLen = MpegAudioSniff.frameLength(32, 44100, 0) // 104 bytes
    var f = 0
    while (f < nFrames) {
      // sync, MPEG-1, Layer III, no CRC, 32 kbps, 44.1 kHz,
      // joint stereo + MS mode extension
      out.write(0xFF); out.write(0xFB); out.write(0x10); out.write(0x60)
      def recipe(ch: Int, gr: Int) =
        GranuleRecipe(if (ch == 0) id else id + sideSeed, f, gr)
      val bw = new BitWriter
      bw.write(0, 9) // main_data_begin
      bw.write(0, 3) // private (stereo)
      bw.write(0, 8) // scfsi × 2 channels
      for (gr <- 0 until 2; ch <- 0 until 2) {
        val r = recipe(ch, gr)
        bw.write(r.part23Length, 12)
        bw.write(r.nPairs, 9)
        bw.write(210 + 4 * r.gainExp, 8)
        bw.write(0, 4); bw.write(0, 1)
        bw.write(1, 5); bw.write(1, 5); bw.write(1, 5)
        bw.write(3, 4); bw.write(3, 3)
        bw.write(0, 1); bw.write(0, 1); bw.write(1, 1)
      }
      val si = bw.bytes
      require(si.length == 32, s"stereo side info must be 32 bytes, got ${si.length}")
      out.write(si, 0, 32)
      val md = new BitWriter
      for (gr <- 0 until 2; ch <- 0 until 2) {
        val r = recipe(ch, gr)
        var p = 0
        while (p < r.nPairs) {
          val (x, y) = r.pairMag(p)
          val (code, len) = pairTable1Code(x, y)
          md.write(code, len)
          val (sx, sy) = r.pairSign(p)
          if (x != 0) md.write(sx, 1)
          if (y != 0) md.write(sy, 1)
          p += 1
        }
        var q = 0
        while (q < r.nQuads) {
          val m = r.quadMag(q)
          md.write(~((m(0) << 3) | (m(1) << 2) | (m(2) << 1) | m(3)) & 0xF, 4)
          var j = 0
          while (j < 4) {
            if (m(j) != 0) md.write(r.quadSign(q, j + 1), 1)
            j += 1
          }
          q += 1
        }
      }
      val main = md.bytes
      val room = frameLen - 4 - 32
      require(main.length <= room, s"main data ${main.length} exceeds $room")
      out.write(main, 0, main.length)
      var pad = main.length
      while (pad < room) { out.write(0); pad += 1 }
      f += 1
    }
    out.toByteArray
  }

  /** START/STOP twin of [[synthesizeCoded]]: mono frames whose granule
    * 0 is block_type 1 (START — the long→short transition window) and
    * granule 1 is block_type 3 (STOP) — the bracket every real encoder
    * writes around a transient's short-block run. Window-switching
    * side info with the IMPLICIT region split (region0_count 7), zero
    * subblock gains (long-family blocks never apply them), recipes and
    * gains exactly as [[synthesizeCoded]] — so requantized lines stay
    * ±2^g and the oracle replays spectra AND the block_type column
    * closed-form. With `mixed = true` the granules set
    * mixed_block_flag: the SPECTRAL surface is bit-identical (long
    * layout, no reorder — §2.4.2.7 keys the short/mixed scalefactor
    * partitions on block_type 2), so the same oracle must hold, and
    * the window routing difference (subbands 0–1 normal-windowed) is
    * spec-gated in Mp3Spec.
    */
  def synthesizeCodedStartStop(
      id: Long, nFrames: Int, mixed: Boolean = false): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val frameLen = MpegAudioSniff.frameLength(32, 44100, 0) // 104 bytes
    var f = 0
    while (f < nFrames) {
      out.write(0xFF); out.write(0xFB); out.write(0x10); out.write(0xC0)
      val bw = new BitWriter
      bw.write(0, 9); bw.write(0, 5); bw.write(0, 4)
      for (gr <- 0 until 2) {
        val r = GranuleRecipe(id, f, gr)
        bw.write(r.part23Length, 12)
        bw.write(r.nPairs, 9)
        bw.write(210 + 4 * r.gainExp, 8)
        bw.write(0, 4) // scalefac_compress
        bw.write(1, 1) // window_switching
        bw.write(if (gr == 0) 1 else 3, 2) // block_type: start then stop
        bw.write(if (mixed) 1 else 0, 1) // mixed_block_flag
        bw.write(1, 5); bw.write(1, 5) // table_select × 2
        for (_ <- 0 until 3) bw.write(0, 3) // subblock_gain (unused, long)
        bw.write(0, 1); bw.write(0, 1); bw.write(1, 1)
      }
      val si = bw.bytes
      require(si.length == 17, s"side info must be 17 bytes, got ${si.length}")
      out.write(si, 0, 17)
      val md = new BitWriter
      for (gr <- 0 until 2) {
        val r = GranuleRecipe(id, f, gr)
        var p = 0
        while (p < r.nPairs) {
          val (x, y) = r.pairMag(p)
          val (code, len) = pairTable1Code(x, y)
          md.write(code, len)
          val (sx, sy) = r.pairSign(p)
          if (x != 0) md.write(sx, 1)
          if (y != 0) md.write(sy, 1)
          p += 1
        }
        var q = 0
        while (q < r.nQuads) {
          val m = r.quadMag(q)
          md.write(~((m(0) << 3) | (m(1) << 2) | (m(2) << 1) | m(3)) & 0xF, 4)
          var j = 0
          while (j < 4) {
            if (m(j) != 0) md.write(r.quadSign(q, j + 1), 1)
            j += 1
          }
          q += 1
        }
      }
      val main = md.bytes
      val room = frameLen - 4 - 17
      require(main.length <= room, s"main data ${main.length} exceeds $room")
      out.write(main, 0, main.length)
      var pad = main.length
      while (pad < room) { out.write(0); pad += 1 }
      f += 1
    }
    out.toByteArray
  }

  /** MIXED-BLOCK twin of [[synthesizeCodedShort]]: window-switching
    * type-2 granules with mixed_block_flag SET — the hybrid shape
    * encoders emit when a transient sits over tonal bass: the lowest
    * two subbands stay long-windowed, everything above is short. Pair
    * recipes are sized (base 19) so big_values themselves CROSS the
    * long/short seam at line 36, and the count1 region runs well into
    * the short reorder; per-window subblock gains apply ONLY to the
    * short part — all exact dyadic, oracle-replayable.
    */
  def synthesizeCodedMixed(id: Long, nFrames: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val frameLen = MpegAudioSniff.frameLength(32, 44100, 0)
    var f = 0
    while (f < nFrames) {
      out.write(0xFF); out.write(0xFB); out.write(0x10); out.write(0xC0)
      val bw = new BitWriter
      bw.write(0, 9); bw.write(0, 5); bw.write(0, 4)
      for (gr <- 0 until 2) {
        val r = GranuleRecipe(id, f, gr, basePairs = 19, baseQuads = 8)
        bw.write(r.part23Length, 12)
        bw.write(r.nPairs, 9)
        bw.write(210 + 4 * r.gainExp, 8)
        bw.write(0, 4) // scalefac_compress → zero scalefactor bits
        bw.write(1, 1) // window_switching
        bw.write(2, 2) // block_type: short…
        bw.write(1, 1) // …with mixed_block_flag SET
        bw.write(1, 5); bw.write(1, 5) // table_select × 2
        for (w <- 0 until 3) bw.write(((id + f + gr + w) % 3).toInt, 3)
        bw.write(0, 1); bw.write(0, 1); bw.write(1, 1)
      }
      val si = bw.bytes
      require(si.length == 17, s"side info must be 17 bytes, got ${si.length}")
      out.write(si, 0, 17)
      val md = new BitWriter
      for (gr <- 0 until 2) {
        val r = GranuleRecipe(id, f, gr, basePairs = 19, baseQuads = 8)
        var p = 0
        while (p < r.nPairs) {
          val (x, y) = r.pairMag(p)
          val (code, len) = pairTable1Code(x, y)
          md.write(code, len)
          val (sx, sy) = r.pairSign(p)
          if (x != 0) md.write(sx, 1)
          if (y != 0) md.write(sy, 1)
          p += 1
        }
        var q = 0
        while (q < r.nQuads) {
          val m = r.quadMag(q)
          md.write(~((m(0) << 3) | (m(1) << 2) | (m(2) << 1) | m(3)) & 0xF, 4)
          var j = 0
          while (j < 4) {
            if (m(j) != 0) md.write(r.quadSign(q, j + 1), 1)
            j += 1
          }
          q += 1
        }
      }
      val main = md.bytes
      val room = frameLen - 4 - 17
      require(main.length <= room, s"main data ${main.length} exceeds $room")
      out.write(main, 0, main.length)
      var pad = main.length
      while (pad < room) { out.write(0); pad += 1 }
      f += 1
    }
    out.toByteArray
  }

  /** The intensity synthesizer's is_pos alphabet: only positions whose
    * pan ratio is EXACT (0 → fully right, 6 → fully left via r → ∞)
    * plus the illegal 7 (pass-through) — so every output line stays an
    * exact dyadic and the oracle replays the pan in integers. The
    * irrational ratios (is_pos 1–5, tan(is_pos·π/12)) are decoded by
    * the same code path and spec-gated in-JVM (Mp3Spec) where both
    * sides share one libm.
    */
  val IsPosAlphabet: Array[Int] = Array(0, 6, 7)

  /** INTENSITY joint-stereo twin of [[synthesizeCoded]] (mode 01,
    * mode_extension 01): channel 0 codes the full recipe for `id`
    * (basePairs 10 / baseQuads 8 — lines reach past several band
    * boundaries); channel 1 a SHORT recipe for `id + MsSideSeed`
    * (basePairs 2 / baseQuads 1), so its coded region ends well below
    * channel 0's and the intensity region is non-trivial. Channel 1's
    * scalefac_compress is 3 (slen 0/3): bands 11–20 carry 3-bit
    * scalefactors = the is_pos positions, drawn from [[IsPosAlphabet]]
    * by (rid + band + f + gr) mod 3. Those bands sit entirely above
    * channel 1's coded lines, so the positions never touch its own
    * requantization — they are pure stereo-position carriers, exactly
    * the trick real intensity encoders use. `modeExt` selects the
    * joint-stereo flavor: 1 = pure intensity (default), 3 = intensity
    * COMBINED with MS — the same bit layout, only the header's
    * mode_extension changes, so the decode-side routing (MS below the
    * bound, is_pos 7 → MS instead of pass-through) is the entire
    * difference under test.
    */
  def synthesizeCodedIntensity(
      id: Long, nFrames: Int, sideSeed: Long = MsSideSeed,
      alphabet: Array[Int] = IsPosAlphabet, modeExt: Int = 1): Array[Byte] = {
    require(modeExt == 1 || modeExt == 3,
      s"intensity synthesizer: mode_extension $modeExt has no intensity bit")
    val out = new java.io.ByteArrayOutputStream()
    val frameLen = MpegAudioSniff.frameLength(32, 44100, 0) // 104 bytes
    var f = 0
    while (f < nFrames) {
      // sync, MPEG-1, Layer III, no CRC, 32 kbps, 44.1 kHz,
      // joint stereo + the requested mode extension
      out.write(0xFF); out.write(0xFB); out.write(0x10)
      out.write(0x40 | (modeExt << 4))
      def recipe(ch: Int, gr: Int) =
        if (ch == 0) GranuleRecipe(id, f, gr, basePairs = 10, baseQuads = 8)
        else GranuleRecipe(id + sideSeed, f, gr, basePairs = 2, baseQuads = 1)
      val bw = new BitWriter
      bw.write(0, 9) // main_data_begin
      bw.write(0, 3) // private (stereo)
      bw.write(0, 8) // scfsi × 2 channels
      for (gr <- 0 until 2; ch <- 0 until 2) {
        val r = recipe(ch, gr)
        // ch1 pays 30 scalefactor bits (10 bands × slen2 3) in part2
        bw.write(r.part23Length + (if (ch == 1) 30 else 0), 12)
        bw.write(r.nPairs, 9)
        bw.write(210 + 4 * r.gainExp, 8)
        bw.write(if (ch == 1) 3 else 0, 4) // scalefac_compress
        bw.write(0, 1) // long blocks
        bw.write(1, 5); bw.write(1, 5); bw.write(1, 5)
        bw.write(3, 4); bw.write(3, 3)
        bw.write(0, 1); bw.write(0, 1); bw.write(1, 1)
      }
      val si = bw.bytes
      require(si.length == 32, s"stereo side info must be 32 bytes, got ${si.length}")
      out.write(si, 0, 32)
      val md = new BitWriter
      for (gr <- 0 until 2; ch <- 0 until 2) {
        val r = recipe(ch, gr)
        if (ch == 1) {
          // the is_pos carriers: bands 11–20, 3 bits each
          var band = 11
          while (band < 21) {
            md.write(
              alphabet(((id + sideSeed + band + f + gr) % alphabet.length).toInt), 3)
            band += 1
          }
        }
        var p = 0
        while (p < r.nPairs) {
          val (x, y) = r.pairMag(p)
          val (code, len) = pairTable1Code(x, y)
          md.write(code, len)
          val (sx, sy) = r.pairSign(p)
          if (x != 0) md.write(sx, 1)
          if (y != 0) md.write(sy, 1)
          p += 1
        }
        var q = 0
        while (q < r.nQuads) {
          val m = r.quadMag(q)
          md.write(~((m(0) << 3) | (m(1) << 2) | (m(2) << 1) | m(3)) & 0xF, 4)
          var j = 0
          while (j < 4) {
            if (m(j) != 0) md.write(r.quadSign(q, j + 1), 1)
            j += 1
          }
          q += 1
        }
      }
      val main = md.bytes
      val room = frameLen - 4 - 32
      require(main.length <= room, s"main data ${main.length} exceeds $room")
      out.write(main, 0, main.length)
      var pad = main.length
      while (pad < room) { out.write(0); pad += 1 }
      f += 1
    }
    out.toByteArray
  }

  /** SHORT-BLOCK intensity twin of [[synthesizeCodedIntensity]]:
    * joint-stereo (mode_extension 01) frames whose granules are
    * window-switching type-2 blocks on BOTH channels, at 48 kbps (the
    * bigger recipes need the room). Channel 0 codes a large short
    * recipe (basePairs 18 / baseQuads 22 — every granule's coded lines
    * run past 3·sfbShort(7) = 120 Huffman lines, so the alphabet bands
    * 6–7 carry NONZERO panned values in all three windows); channel 1
    * a small recipe (2/1 — its coded lines stay in bands 0–2, so each
    * window's bound is non-trivial). Channel 1's scalefac_compress is
    * 3 (slen 0/3): short bands 6–11 × 3 windows carry the 3-bit is_pos
    * positions, drawn from `alphabet` by (rid + band + 3·window + f +
    * gr) mod len — pure carriers, above channel 1's own coded region.
    * Subblock gains are ZERO here (an encoder choice — the gains are
    * q361's surface), so every routed line stays exactly ±2^g.
    */
  def synthesizeCodedIntensityShort(
      id: Long, nFrames: Int, sideSeed: Long = MsSideSeed,
      alphabet: Array[Int] = IsPosAlphabet, modeExt: Int = 1): Array[Byte] = {
    require(modeExt == 1 || modeExt == 3,
      s"intensity synthesizer: mode_extension $modeExt has no intensity bit")
    val out = new java.io.ByteArrayOutputStream()
    val frameLen = MpegAudioSniff.frameLength(48, 44100, 0)
    var f = 0
    while (f < nFrames) {
      // sync, MPEG-1, Layer III, no CRC, 48 kbps, 44.1 kHz,
      // joint stereo + the requested mode extension
      out.write(0xFF); out.write(0xFB); out.write(0x30)
      out.write(0x40 | (modeExt << 4))
      def recipe(ch: Int, gr: Int) =
        if (ch == 0) GranuleRecipe(id, f, gr, basePairs = 18, baseQuads = 22)
        else GranuleRecipe(id + sideSeed, f, gr, basePairs = 2, baseQuads = 1)
      val bw = new BitWriter
      bw.write(0, 9) // main_data_begin
      bw.write(0, 3) // private (stereo)
      bw.write(0, 8) // scfsi × 2 channels
      for (gr <- 0 until 2; ch <- 0 until 2) {
        val r = recipe(ch, gr)
        // ch1 pays 54 scalefactor bits (short bands 6–11 × 3 windows
        // × slen2 3) in part2
        bw.write(r.part23Length + (if (ch == 1) 54 else 0), 12)
        bw.write(r.nPairs, 9)
        bw.write(210 + 4 * r.gainExp, 8)
        bw.write(if (ch == 1) 3 else 0, 4) // scalefac_compress
        bw.write(1, 1) // window_switching
        bw.write(2, 2) // block_type: short
        bw.write(0, 1) // mixed_block_flag
        bw.write(1, 5); bw.write(1, 5) // table_select × 2
        for (_ <- 0 until 3) bw.write(0, 3) // subblock_gain: zero
        bw.write(0, 1); bw.write(0, 1); bw.write(1, 1)
      }
      val si = bw.bytes
      require(si.length == 32, s"stereo side info must be 32 bytes, got ${si.length}")
      out.write(si, 0, 32)
      val md = new BitWriter
      for (gr <- 0 until 2; ch <- 0 until 2) {
        val r = recipe(ch, gr)
        if (ch == 1) {
          // the is_pos carriers: short bands 6–11 × windows 0–2, in
          // the (band-major, window) read order of the short layout
          var band = 6
          while (band < 12) {
            var w = 0
            while (w < 3) {
              md.write(alphabet(
                ((id + sideSeed + band + 3 * w + f + gr) % alphabet.length).toInt), 3)
              w += 1
            }
            band += 1
          }
        }
        var p = 0
        while (p < r.nPairs) {
          val (x, y) = r.pairMag(p)
          val (code, len) = pairTable1Code(x, y)
          md.write(code, len)
          val (sx, sy) = r.pairSign(p)
          if (x != 0) md.write(sx, 1)
          if (y != 0) md.write(sy, 1)
          p += 1
        }
        var q = 0
        while (q < r.nQuads) {
          val m = r.quadMag(q)
          md.write(~((m(0) << 3) | (m(1) << 2) | (m(2) << 1) | m(3)) & 0xF, 4)
          var j = 0
          while (j < 4) {
            if (m(j) != 0) md.write(r.quadSign(q, j + 1), 1)
            j += 1
          }
          q += 1
        }
      }
      val main = md.bytes
      val room = frameLen - 4 - 32
      require(main.length <= room, s"main data ${main.length} exceeds $room")
      out.write(main, 0, main.length)
      var pad = main.length
      while (pad < room) { out.write(0); pad += 1 }
      f += 1
    }
    out.toByteArray
  }

  // ------------------------------------------------- time-domain stages

  private val AliasCi =
    Array(-0.6, -0.535, -0.33, -0.185, -0.095, -0.041, -0.0142, -0.0037)
  private val AliasCs = AliasCi.map(c => 1.0 / StrictMath.sqrt(1.0 + c * c))
  private val AliasCa = AliasCi.map(c => c / StrictMath.sqrt(1.0 + c * c))

  /** Alias-reduction butterflies across the 31 subband boundaries
    * (long blocks). In place on a 576-line spectrum copy.
    */
  def aliasReduce(xr: Array[Double]): Array[Double] = {
    val out = xr.clone()
    var sb = 1
    while (sb < 32) {
      var i = 0
      while (i < 8) {
        val a = out(sb * 18 - 1 - i)
        val b = out(sb * 18 + i)
        out(sb * 18 - 1 - i) = a * AliasCs(i) - b * AliasCa(i)
        out(sb * 18 + i) = b * AliasCs(i) + a * AliasCa(i)
        i += 1
      }
      sb += 1
    }
    out
  }

  /** The 36-sample synthesis window for long-family block types (ISO
    * 11172-3 §2.4.3.4.10.3, closed-form):
    *
    *  - type 0 (normal): sin(π/36·(i+½)) over all 36;
    *  - type 1 (START — long→short transition): normal first half,
    *    flat-top 18–23, the short window's DESCENDING half 24–29,
    *    zero 30–35;
    *  - type 3 (STOP — short→long): zero 0–5, the short window's
    *    ASCENDING half 6–11, flat-top 12–17, normal second half.
    */
  def imdctWindow(blockType: Int): Array[Double] = blockType match {
    case 0 => Array.tabulate(36)(i => StrictMath.sin(StrictMath.PI / 36.0 * (i + 0.5)))
    case 1 => Array.tabulate(36) { i =>
      if (i < 18) StrictMath.sin(StrictMath.PI / 36.0 * (i + 0.5))
      else if (i < 24) 1.0
      else if (i < 30) StrictMath.sin(StrictMath.PI / 12.0 * (i - 18 + 0.5))
      else 0.0
    }
    case 3 => Array.tabulate(36) { i =>
      if (i < 6) 0.0
      else if (i < 12) StrictMath.sin(StrictMath.PI / 12.0 * (i - 6 + 0.5))
      else if (i < 18) 1.0
      else StrictMath.sin(StrictMath.PI / 36.0 * (i + 0.5))
    }
    case t => throw new IllegalArgumentException(
      s"mp3: no 36-point window for block_type $t")
  }

  /** 36-point IMDCT of one subband's 18 lines: x_i = Σ_k X_k
    * cos(π/72 · (2i + 1 + 18)(2k + 1)), windowed per `blockType`
    * ([[imdctWindow]] — normal/start/stop).
    */
  def imdctLong(lines: Array[Double], blockType: Int = 0): Array[Double] = {
    require(lines.length == 18, "imdct: 18 lines per subband")
    val w = imdctWindow(blockType)
    Array.tabulate(36) { i =>
      var s = 0.0
      var k = 0
      while (k < 18) {
        s += lines(k) * StrictMath.cos(
          StrictMath.PI / 72.0 * (2 * i + 1 + 18) * (2 * k + 1))
        k += 1
      }
      s * w(i)
    }
  }

  final case class SubbandGranule(
      frameIdx: Int, granule: Int, channel: Int,
      samples: Array[Array[Double]]) // [subband 0..31][t 0..17]

  /** Decode to 32-subband time samples: requantized spectrum → alias
    * reduction → per-subband IMDCT → overlap-add with the previous
    * granule → frequency inversion (odd samples of odd subbands
    * negated). The LAST honest stage — see the object doc for why the
    * final polyphase window is not embedded.
    */
  def decodeSubbands(bytes: Array[Byte]): Seq[SubbandGranule] = {
    val spectra = decodeSpectra(bytes)
    spectra.foreach(g => require(g.info.blockType != 2,
      "mp3: subband decode implements the 36-point (long-family) IMDCT" +
        " only — short blocks need the 12-point×3 stage"))
    val overlap = scala.collection.mutable.Map.empty[Int, Array[Array[Double]]]
    spectra.map { g =>
      val xr = aliasReduce(g.xr)
      val prev = overlap.getOrElseUpdate(g.channel, Array.fill(32, 18)(0.0))
      val out = Array.ofDim[Double](32, 18)
      var sb = 0
      while (sb < 32) {
        // mixed_block_flag on start/stop types: the two LOWEST
        // subbands window with the NORMAL (type 0) shape, the rest
        // with the granule's block_type (ISO 11172-3 §2.4.1.7)
        val t = imdctLong(
          java.util.Arrays.copyOfRange(xr, sb * 18, sb * 18 + 18),
          if (g.info.mixed == 1 && sb < 2) 0 else g.info.blockType)
        var i = 0
        while (i < 18) {
          out(sb)(i) = t(i) + prev(sb)(i)
          prev(sb)(i) = t(18 + i)
          i += 1
        }
        // frequency inversion: odd time samples of odd subbands negate
        if (sb % 2 == 1) {
          i = 1
          while (i < 18) { out(sb)(i) = -out(sb)(i); i += 2 }
        }
        sb += 1
      }
      SubbandGranule(g.frameIdx, g.granule, g.channel, out)
    }
  }
}
