package graft

import graft.multimodal.{Mp3Codec, Multimodal}

/** Layer III decode gates beyond the q355 oracle: Huffman table
  * properties (prefix-freeness + Kraft equality — the misremembered-
  * spec-data guard), the bit reservoir (main_data_begin pointing into
  * the previous frame's payload must decode identically to the inline
  * layout), typed rejection of every unsupported shape, and the
  * time-domain stages (alias reduction, IMDCT linearity, overlap-add
  * plumbing, silence → exact zeros) that have no SQL closed form.
  */
class Mp3Spec extends SparkSpec {

  test("Huffman table 1 is prefix-free with Kraft sum exactly 1; table B is fixed-4") {
    val codes = Seq((0, 0) -> "1", (1, 0) -> "01", (0, 1) -> "001", (1, 1) -> "000")
    // lengths match the synthesizer's accounting
    codes.foreach { case ((x, y), c) =>
      assert(Mp3Codec.pairTable1Len(x, y) == c.length, s"len of ($x,$y)")
      val (v, n) = Mp3Codec.pairTable1Code(x, y)
      assert(n == c.length && Integer.toBinaryString((1 << n) | v).tail == c)
    }
    // prefix-free: no codeword is a prefix of another
    for (a <- codes.map(_._2); b <- codes.map(_._2) if a != b)
      assert(!b.startsWith(a), s"$a prefixes $b")
    // Kraft equality (a complete prefix code): Σ 2^-len == 1
    assert(codes.map(c => math.pow(2.0, -c._2.length)).sum == 1.0)
    // table B: 16 quads, each 4 bits, codes all distinct (one's complement)
    val quadCodes = (0 until 16).map(q => (~q) & 0xF)
    assert(quadCodes.distinct.size == 16)
  }

  test("bit reservoir: main_data_begin into the previous frame decodes identically") {
    val id = 7L
    val s = Mp3Codec.synthesizeCoded(id, 2)
    val frameLen = 104
    assert(s.length == 2 * frameLen)
    val base = Mp3Codec.decodeSpectra(s)
    // move the first k bytes of frame 1's main data into frame 0's
    // padding tail and point main_data_begin back at them
    val r0 = Mp3Codec.GranuleRecipe(id, 1, 0)
    val r1 = Mp3Codec.GranuleRecipe(id, 1, 1)
    val l1 = (r0.part23Length + r1.part23Length + 7) / 8
    val k = math.min(5, l1)
    val moved = s.clone()
    val f1Main = frameLen + 4 + 17
    // frame 0's payload tail is zero padding (main data is ≤ ~25 bytes)
    (0 until k).foreach { i =>
      moved(frameLen - k + i) = s(f1Main + i)
    }
    // shift frame 1's main data left by k, zero the freed tail
    (0 until (frameLen - 21 - k)).foreach { i =>
      moved(f1Main + i) = s(f1Main + k + i)
    }
    (0 until k).foreach(i => moved(2 * frameLen - 1 - i) = 0)
    // main_data_begin = k: top 8 bits in side-info byte 0, low bit in
    // byte 1's MSB
    moved(frameLen + 4) = ((k >> 1) & 0xFF).toByte
    moved(frameLen + 5) = ((moved(frameLen + 5) & 0x7F) | ((k & 1) << 7)).toByte
    val got = Mp3Codec.decodeSpectra(moved)
    assert(got.size == base.size)
    base.zip(got).foreach { case (a, b) =>
      assert(a.is.toSeq == b.is.toSeq, s"frame ${a.frameIdx} gr ${a.granule}")
      assert(a.xr.toSeq == b.xr.toSeq)
    }
    // a main_data_begin the reservoir cannot satisfy fails loudly:
    // point frame 0 (no prior frames) back 1 byte
    val bad = s.clone()
    bad(4) = 0.toByte; bad(5) = (0x80 | (bad(5) & 0x7F)).toByte
    val e = intercept[IllegalArgumentException](Mp3Codec.decodeSpectra(bad))
    assert(e.getMessage.contains("reservoir"))
  }

  test("typed rejection: layers I/II, MPEG-2, free format, " +
    "forbidden block_type 0 window switch, non-embedded tables") {
    val good = Mp3Codec.synthesizeCoded(1L, 1)
    def mut(f: Array[Byte] => Unit): Array[Byte] = {
      val b = good.clone(); f(b); b
    }
    def rejects(b: Array[Byte], frag: String): Unit = {
      val e = intercept[IllegalArgumentException](Mp3Codec.decodeSpectra(b))
      assert(e.getMessage.toLowerCase.contains(frag), e.getMessage)
    }
    rejects(mut(b => b(1) = 0xFD.toByte), "layer") // layer II
    rejects(mut(b => b(1) = 0xF3.toByte), "mpeg") // MPEG-2
    rejects(mut(b => b(2) = 0x00.toByte), "free-format")
    // window_switching flipped on a long granule: the next 2 bits (the
    // old table_select's top bits, 00) parse as block_type 0 — the
    // combination ISO §2.4.1.7 forbids
    rejects(mut(b => b(10) = (b(10) | 0x10).toByte), "forbidden")
    // flip count1table_select (last bit of granule 0's 59-bit block,
    // bit 18+59-1=76 → byte 9, bit 7-(76-72)=3) to table A
    rejects(mut(b => b(13) = (b(13) & ~0x08).toByte), "count1")
  }

  test("combined joint stereo (mode_extension 3): MS below the intensity " +
    "bound, pan at/above it, ILLEGAL positions fall back to MS — not " +
    "pass-through as in pure intensity") {
    val id = 13L
    val seed = Mp3Codec.MsSideSeed
    val sfbL = Mp3Codec.SfbLong(44100)
    val sqrt2 = StrictMath.sqrt(2.0)
    // the two coded channels replayed by hand from the recipe
    def mono(rid: Long, bp: Int, bq: Int): Seq[Array[Double]] =
      (0 until 2).flatMap { f =>
        (0 until 2).map { gr =>
          val rec = Mp3Codec.GranuleRecipe(rid, f, gr, basePairs = bp, baseQuads = bq)
          val xr = new Array[Double](576)
          var h = 0
          def put(line: Int, v: Int): Unit =
            if (v != 0) xr(line) = v * StrictMath.pow(2.0, rec.gainExp.toDouble)
          (0 until rec.nPairs).foreach { p =>
            val (x, y) = rec.pairMag(p); val (sx, sy) = rec.pairSign(p)
            put(h, x * (1 - 2 * sx * x)); put(h + 1, y * (1 - 2 * sy * y))
            h += 2
          }
          (0 until rec.nQuads).foreach { q =>
            val m = rec.quadMag(q)
            (0 until 4).foreach(j =>
              put(h + j, m(j) * (1 - 2 * rec.quadSign(q, j + 1) * m(j))))
            h += 4
          }
          xr
        }
      }
    val ch0 = mono(id, 10, 8)
    val ch1 = mono(id + seed, 2, 1)
    def expect(alphabet: Array[Int]): Unit = {
      val got = Mp3Codec.decodeSpectra(
        Mp3Codec.synthesizeCodedIntensity(id, 2, seed, alphabet, modeExt = 3))
      assert(got.size == 8)
      got.grouped(2).zipWithIndex.foreach { case (Seq(l, r), k) =>
        val f = k / 2; val gr = k % 2
        val v0 = ch0(k); val v1 = ch1(k)
        var rzero = 576
        while (rzero > 0 && v1(rzero - 1) == 0.0) rzero -= 1
        def ms(i: Int): Unit = {
          assert(l.xr(i) == (v0(i) + v1(i)) / sqrt2, s"MS-L g$k l$i")
          assert(r.xr(i) == (v0(i) - v1(i)) / sqrt2, s"MS-R g$k l$i")
        }
        (0 until 21).foreach { band =>
          val st = sfbL(band); val en = sfbL(band + 1)
          if (st < rzero) (st until en).foreach(ms) // below the bound: MS
          else {
            val isPos =
              if (band < 11) 0
              else alphabet(((id + seed + band + f + gr) % alphabet.length).toInt)
            (st until en).foreach { i =>
              if (isPos == 7) ms(i) // illegal position under ms_stereo: MS
              else if (isPos == 6) assert(l.xr(i) == v0(i) && r.xr(i) == 0.0)
              else if (isPos == 0) assert(l.xr(i) == 0.0 && r.xr(i) == v0(i))
              else {
                val ratio = StrictMath.tan(isPos * StrictMath.PI / 12.0)
                assert(l.xr(i) == v0(i) * (ratio / (1.0 + ratio)), s"L g$k l$i")
                assert(r.xr(i) == v0(i) * (1.0 / (1.0 + ratio)), s"R g$k l$i")
              }
            }
          }
        }
        // the no-is_pos zone above sfb 20 reconstructs in MS too
        (sfbL(21) until 576).foreach(ms)
      }
    }
    expect(Mp3Codec.IsPosAlphabet) // the oracle-gated exact alphabet
    expect(Array(1, 2, 3, 4, 5)) // the irrational tan ratios, in-JVM
    expect(Array(7)) // every band illegal → full-spectrum MS
    // the same BITS under mode_extension 1 vs 3 must differ exactly at
    // the illegal-position rule: pure intensity passes through, the
    // combined mode matrixes — an all-illegal alphabet maximizes the
    // divergent region
    val pure = Mp3Codec.decodeSpectra(
      Mp3Codec.synthesizeCodedIntensity(id, 1, seed, Array(7)))
    val comb = Mp3Codec.decodeSpectra(
      Mp3Codec.synthesizeCodedIntensity(id, 1, seed, Array(7), modeExt = 3))
    val differs = pure.zip(comb).exists { case (a, b) =>
      a.xr.toSeq != b.xr.toSeq
    }
    assert(differs, "mode_extension 3 must not decode as pure intensity")
  }

  test("short-block intensity: per-window bounds, pan at natural positions, " +
    "irrational ratios, zero-slen lower bands read is_pos 0") {
    val id = 17L
    val seed = Mp3Codec.MsSideSeed
    val sfbS = Mp3Codec.SfbShort(44100)
    // each coded channel replayed by hand: recipe lines in Huffman
    // order, reordered to natural positions (no subblock gains here)
    def mono(rid: Long, bp: Int, bq: Int): Seq[Array[Double]] =
      (0 until 2).flatMap { f =>
        (0 until 2).map { gr =>
          val rec = Mp3Codec.GranuleRecipe(rid, f, gr, basePairs = bp, baseQuads = bq)
          val xr = new Array[Double](576)
          def put(hl: Int, v: Int): Unit = if (v != 0) {
            var b = 0
            while (hl >= 3 * sfbS(b + 1)) b += 1
            val st = sfbS(b); val width = sfbS(b + 1) - st
            val k = hl - 3 * st
            xr(3 * (st + k % width) + k / width) =
              v * StrictMath.pow(2.0, rec.gainExp.toDouble)
          }
          var h = 0
          (0 until rec.nPairs).foreach { p =>
            val (x, y) = rec.pairMag(p); val (sx, sy) = rec.pairSign(p)
            put(h, x * (1 - 2 * sx * x)); put(h + 1, y * (1 - 2 * sy * y))
            h += 2
          }
          (0 until rec.nQuads).foreach { q =>
            val m = rec.quadMag(q)
            (0 until 4).foreach(j =>
              put(h + j, m(j) * (1 - 2 * rec.quadSign(q, j + 1) * m(j))))
            h += 4
          }
          xr
        }
      }
    val ch0 = mono(id, 18, 22)
    val ch1 = mono(id + seed, 2, 1)
    def expect(alphabet: Array[Int]): Unit = {
      val got = Mp3Codec.decodeSpectra(
        Mp3Codec.synthesizeCodedIntensityShort(id, 2, seed, alphabet))
      assert(got.size == 8)
      got.grouped(2).zipWithIndex.foreach { case (Seq(l, r), k) =>
        assert(l.info.blockType == 2 && r.info.blockType == 2)
        val f = k / 2; val gr = k % 2
        val v0 = ch0(k); val v1 = ch1(k)
        // per-window bound: highest band with a nonzero ch1 line in
        // that window, plus one
        val bound = Array.tabulate(3) { w =>
          (0 to 11).filter { b =>
            (sfbS(b) until sfbS(b + 1)).exists(i => v1(3 * i + w) != 0.0)
          }.lastOption.map(_ + 1).getOrElse(0)
        }
        (0 until 12).foreach { b =>
          (0 until 3).foreach { w =>
            val isPos =
              if (b < 6) 0
              else alphabet(((id + seed + b + 3 * w + f + gr) % alphabet.length).toInt)
            (sfbS(b) until sfbS(b + 1)).foreach { pos =>
              val i = 3 * pos + w
              if (b < bound(w)) {
                assert(l.xr(i) == v0(i) && r.xr(i) == v1(i), s"below g$k w$w l$i")
              } else if (isPos == 7) {
                assert(l.xr(i) == v0(i) && r.xr(i) == v1(i), s"illegal g$k l$i")
              } else if (isPos == 6) {
                assert(l.xr(i) == v0(i) && r.xr(i) == 0.0, s"left g$k l$i")
              } else if (isPos == 0) {
                assert(l.xr(i) == 0.0 && r.xr(i) == v0(i), s"right g$k l$i")
              } else {
                val ratio = StrictMath.tan(isPos * StrictMath.PI / 12.0)
                assert(l.xr(i) == v0(i) * (ratio / (1.0 + ratio)), s"L g$k l$i")
                assert(r.xr(i) == v0(i) * (1.0 / (1.0 + ratio)), s"R g$k l$i")
              }
            }
          }
        }
      }
    }
    expect(Mp3Codec.IsPosAlphabet) // the oracle-gated exact alphabet
    expect(Array(1, 2, 3, 4, 5)) // the irrational tan ratios, in-JVM
    // intensity over MIXED-block granules still rejects typed: flip the
    // mixed bit of granule 0 / channel 0 (window-switching block starts
    // at side-info bit 20+12+9+8+4 = 53; ws(1) bt(2) → mixed at bit 56
    // → absolute bit 4·8 + 56 = 88 → byte 11, mask 0x80)
    val bad = Mp3Codec.synthesizeCodedIntensityShort(id, 1, seed).clone()
    bad(11) = (bad(11) | 0x80.toByte).toByte
    val e = intercept[IllegalArgumentException](Mp3Codec.decodeSpectra(bad))
    assert(e.getMessage.contains("mixed or mismatched"))

    // COMBINED (mode_extension 3) over the same short bits: MS is the
    // default everywhere — below each window's bound, at illegal
    // positions, and in the no-is_pos zone — with intensity bands
    // overwriting the pan
    def expectCombined(alphabet: Array[Int]): Unit = {
      val sqrt2 = StrictMath.sqrt(2.0)
      val got = Mp3Codec.decodeSpectra(
        Mp3Codec.synthesizeCodedIntensityShort(id, 2, seed, alphabet, modeExt = 3))
      assert(got.size == 8)
      got.grouped(2).zipWithIndex.foreach { case (Seq(l, r), k) =>
        val f = k / 2; val gr = k % 2
        val v0 = ch0(k); val v1 = ch1(k)
        val bound = Array.tabulate(3) { w =>
          (0 to 11).filter { b =>
            (sfbS(b) until sfbS(b + 1)).exists(i => v1(3 * i + w) != 0.0)
          }.lastOption.map(_ + 1).getOrElse(0)
        }
        (0 until 192).foreach { pos =>
          (0 until 3).foreach { w =>
            val i = 3 * pos + w
            val b = (0 to 12).find(b => pos < sfbS(b + 1)).get
            val isPos =
              if (b >= 12 || b < bound(w)) 7
              else if (b < 6) 0
              else alphabet(((id + seed + b + 3 * w + f + gr) % alphabet.length).toInt)
            if (isPos == 7) {
              assert(l.xr(i) == (v0(i) + v1(i)) / sqrt2, s"MS-L g$k l$i")
              assert(r.xr(i) == (v0(i) - v1(i)) / sqrt2, s"MS-R g$k l$i")
            } else if (isPos == 6) {
              assert(l.xr(i) == v0(i) && r.xr(i) == 0.0, s"left g$k l$i")
            } else if (isPos == 0) {
              assert(l.xr(i) == 0.0 && r.xr(i) == v0(i), s"right g$k l$i")
            } else {
              val ratio = StrictMath.tan(isPos * StrictMath.PI / 12.0)
              assert(l.xr(i) == v0(i) * (ratio / (1.0 + ratio)), s"L g$k l$i")
              assert(r.xr(i) == v0(i) * (1.0 / (1.0 + ratio)), s"R g$k l$i")
            }
          }
        }
      }
    }
    expectCombined(Mp3Codec.IsPosAlphabet)
    expectCombined(Array(1, 2, 3, 4, 5))
    expectCombined(Array(7)) // every band illegal → full-spectrum MS
    // same bits, mode_extension 1 vs 3 must differ at the illegal rule
    val pureS = Mp3Codec.decodeSpectra(
      Mp3Codec.synthesizeCodedIntensityShort(id, 1, seed, Array(7)))
    val combS = Mp3Codec.decodeSpectra(
      Mp3Codec.synthesizeCodedIntensityShort(id, 1, seed, Array(7), modeExt = 3))
    assert(pureS.zip(combS).exists { case (a, b) => a.xr.toSeq != b.xr.toSeq },
      "combined short must not decode as pure short intensity")
  }

  test("mixed start/stop blocks: spectra identical to the unmixed bracket, " +
    "subbands 0-1 window NORMAL while 2+ keep the block_type window") {
    val id = 9L
    // SPECTRAL surface: bit-identical side info layout, long
    // scalefactor path, no reorder — mixed flag or not
    val plain = Mp3Codec.decodeSpectra(Mp3Codec.synthesizeCodedStartStop(id, 2))
    val mixed = Mp3Codec.decodeSpectra(
      Mp3Codec.synthesizeCodedStartStop(id, 2, mixed = true))
    assert(plain.size == mixed.size && plain.nonEmpty)
    plain.zip(mixed).foreach { case (a, b) =>
      assert(a.info.blockType == b.info.blockType)
      assert(a.info.mixed == 0 && b.info.mixed == 1)
      assert(a.is.toSeq == b.is.toSeq)
      assert(a.xr.toSeq == b.xr.toSeq, "mixed flag must not touch the spectrum")
    }
    // WINDOW routing (one frame: granule 0 START, granule 1 STOP).
    // Granule 0's OUTPUT samples are identical either way — the type-0
    // and type-1 windows agree on the first half — but its TAIL and
    // granule 1's own first half differ in subbands 0-1 only.
    val sbP = Mp3Codec.decodeSubbands(Mp3Codec.synthesizeCodedStartStop(id, 1))
    val sbM = Mp3Codec.decodeSubbands(
      Mp3Codec.synthesizeCodedStartStop(id, 1, mixed = true))
    assert(sbP.size == 2 && sbM.size == 2)
    (0 until 32).foreach { sb =>
      assert(sbP(0).samples(sb).toSeq == sbM(0).samples(sb).toSeq,
        s"granule 0 subband $sb: START first half == NORMAL first half")
    }
    (2 until 32).foreach { sb =>
      assert(sbP(1).samples(sb).toSeq == sbM(1).samples(sb).toSeq,
        s"granule 1 subband $sb keeps the STOP window")
    }
    assert((0 until 2).exists(sb =>
      sbP(1).samples(sb).toSeq != sbM(1).samples(sb).toSeq),
      "granule 1 subbands 0-1 must feel the NORMAL window")
    // closed-form replay of granule 1's subband 0 (even subband — no
    // frequency inversion): own NORMAL-windowed IMDCT first half plus
    // granule 0's NORMAL-windowed tail
    val spec = Mp3Codec.decodeSpectra(
      Mp3Codec.synthesizeCodedStartStop(id, 1, mixed = true))
    def sb0(g: Int): Array[Double] = java.util.Arrays.copyOfRange(
      Mp3Codec.aliasReduce(spec(g).xr), 0, 18)
    val t0 = Mp3Codec.imdctLong(sb0(0), 0)
    val t1 = Mp3Codec.imdctLong(sb0(1), 0)
    val expected = Array.tabulate(18)(i => t1(i) + t0(18 + i))
    assert(sbM(1).samples(0).toSeq == expected.toSeq,
      "granule 1 subband 0 = NORMAL-window IMDCT + NORMAL-window tail")
  }

  test("time-domain stages: silence is exact zeros; IMDCT is linear; " +
    "overlap-add carries the granule tail; deterministic") {
    // an all-zero spectrum decodes to EXACT zero subband samples — the
    // one time-domain case with a closed form
    val silent = Mp3Codec.synthesizeCoded(0L, 1) // id 0, f 0: has content
    // craft silence by zeroing big_values/count1: simplest honest route —
    // decode real frames, then check the IMDCT layer directly
    val zeros = Mp3Codec.imdctLong(new Array[Double](18))
    assert(zeros.forall(_ == 0.0))
    // linearity (the property an implementation drift would break)
    val a = Array.tabulate(18)(i => math.sin(i + 1.0))
    val b = Array.tabulate(18)(i => math.cos(2.0 * i))
    val ab = Array.tabulate(18)(i => a(i) + b(i))
    val ia = Mp3Codec.imdctLong(a); val ib = Mp3Codec.imdctLong(b)
    val iab = Mp3Codec.imdctLong(ab)
    (0 until 36).foreach(i => assert(math.abs(iab(i) - (ia(i) + ib(i))) < 1e-12))
    // overlap-add: decode 2 frames; granule g's subband output must
    // include granule g−1's IMDCT tail. Verify via the public surface:
    // two decodes of the same bytes are bit-identical (StrictMath
    // determinism), and the first granule differs from the second
    // (overlap state advanced)
    val sb1 = Mp3Codec.decodeSubbands(silent)
    val sb2 = Mp3Codec.decodeSubbands(silent)
    assert(sb1.size == 2)
    sb1.zip(sb2).foreach { case (x, y) =>
      (0 until 32).foreach(s => assert(x.samples(s).toSeq == y.samples(s).toSeq))
    }
    // alias reduction preserves total energy across each boundary pair
    // (cs² + ca² = 1): Σ xr² invariant
    val xr = Array.tabulate(576)(i => math.sin(i * 0.37) * 3.0)
    val ar = Mp3Codec.aliasReduce(xr)
    val e0 = xr.map(v => v * v).sum
    val e1 = ar.map(v => v * v).sum
    assert(math.abs(e0 - e1) / e0 < 1e-12)
    assert(ar.toSeq != xr.toSeq) // it did something
  }

  test("short blocks: reorder permutation exact, subblock gains per window, " +
    "long-only stages reject") {
    val id = 5L
    val out = Mp3Codec.decodeSpectra(Mp3Codec.synthesizeCodedShort(id, 1))
    assert(out.size == 2)
    out.foreach { g =>
      assert(g.info.blockType == 2)
      val rec = Mp3Codec.GranuleRecipe(id, 0, g.granule, basePairs = 10, baseQuads = 8)
      // rebuild the huffman-order values and replay the reorder by hand
      val sfb = Mp3Codec.SfbShort(44100)
      val expected = new Array[Double](576)
      def place(h: Int, v: Int): Unit = if (v != 0) {
        val b = (0 until 13).find(b => h < 3 * sfb(b + 1)).get
        val start = sfb(b); val width = sfb(b + 1) - start
        val k = h - 3 * start
        val win = k / width; val idx = k % width
        val e = rec.gainExp - 2 * ((id + 0 + g.granule + win) % 3).toInt
        expected(3 * (start + idx) + win) =
          v * StrictMath.pow(2.0, e.toDouble)
      }
      var h = 0
      (0 until rec.nPairs).foreach { p =>
        val (x, y) = rec.pairMag(p); val (sx, sy) = rec.pairSign(p)
        place(h, x * (1 - 2 * sx * x)); // sign applies only when nonzero
        place(h + 1, y * (1 - 2 * sy * y))
        h += 2
      }
      (0 until rec.nQuads).foreach { q =>
        val m = rec.quadMag(q)
        (0 until 4).foreach { j =>
          place(h + j, m(j) * (1 - 2 * rec.quadSign(q, j + 1) * m(j)))
        }
        h += 4
      }
      assert(g.xr.toSeq == expected.toSeq, s"granule ${g.granule}")
    }
    // the subband/IMDCT stage is long-FAMILY-only — short granules reject
    val e = intercept[IllegalArgumentException](
      Mp3Codec.decodeSubbands(Mp3Codec.synthesizeCodedShort(id, 1)))
    assert(e.getMessage.contains("long-family"))
  }

  test("mixed blocks: long chain below line 36, short reorder + window gains above, " +
    "17+18 scalefactor layout, bit-surgered mixed flag on START accepted") {
    val id = 21L
    val out = Mp3Codec.decodeSpectra(Mp3Codec.synthesizeCodedMixed(id, 2))
    assert(out.size == 4)
    out.foreach { g =>
      assert(g.info.blockType == 2 && g.info.mixed == 1)
      assert(g.info.region0Count == 7)
      val f = g.frameIdx
      val rec = Mp3Codec.GranuleRecipe(id, f, g.granule, basePairs = 19, baseQuads = 8)
      // hand-replay: huffman order h < 36 → identity (long, gain 2^g);
      // h >= 36 → short reorder from band 3 with subblock gains
      val sfbS = Mp3Codec.SfbShort(44100)
      val expected = new Array[Double](576)
      def place(h: Int, v: Int): Unit = if (v != 0) {
        if (h < 36) expected(h) = v * StrictMath.pow(2.0, rec.gainExp.toDouble)
        else {
          val b = (3 until 13).find(b => h < 3 * sfbS(b + 1)).get
          val start = sfbS(b); val width = sfbS(b + 1) - start
          val k = h - 3 * start
          val win = k / width; val idx = k % width
          val e = rec.gainExp - 2 * ((id + f + g.granule + win) % 3).toInt
          expected(3 * (start + idx) + win) = v * StrictMath.pow(2.0, e.toDouble)
        }
      }
      var h = 0
      (0 until rec.nPairs).foreach { p =>
        val (x, y) = rec.pairMag(p); val (sx, sy) = rec.pairSign(p)
        place(h, x * (1 - 2 * sx * x)); place(h + 1, y * (1 - 2 * sy * y))
        h += 2
      }
      (0 until rec.nQuads).foreach { q =>
        val m = rec.quadMag(q)
        (0 until 4).foreach(j =>
          place(h + j, m(j) * (1 - 2 * rec.quadSign(q, j + 1) * m(j))))
        h += 4
      }
      // the recipe is sized to CROSS the seam: pairs end past line 36
      assert(2 * rec.nPairs > 36, "fixture must cross the long/short seam")
      assert(g.xr.toSeq == expected.toSeq, s"frame $f granule ${g.granule}")
    }
    // mixed_block_flag bit-surgered ONTO a START block (the former
    // typed rejection, now accepted per §2.4.1.7): the flag is a pure
    // window split for long-family types — the SPECTRUM must be
    // untouched. Granule 0's window-switching block starts at side-info
    // bit 18+12+9+8+4 = 51; ws(1) bt(2) then mixed → absolute bit
    // 4*8 + 54 = 86 → byte 10, bit 86-80=6 (mask 0x02)
    val ss = Mp3Codec.synthesizeCodedStartStop(id, 1).clone()
    ss(10) = (ss(10) | 0x02).toByte
    val surgered = Mp3Codec.decodeSpectra(ss)
    val unmixed = Mp3Codec.decodeSpectra(Mp3Codec.synthesizeCodedStartStop(id, 1))
    assert(surgered.size == unmixed.size)
    surgered.zip(unmixed).foreach { case (a, b) =>
      assert((a.info.mixed == 1) == (a.granule == 0)) // only granule 0 flipped
      assert(a.xr.toSeq == b.xr.toSeq)
    }
  }

  test("start/stop blocks: window-switching side info parses types 1/3, " +
    "spectra match the long recipe, windows match the ISO closed forms") {
    val id = 9L
    val out = Mp3Codec.decodeSpectra(Mp3Codec.synthesizeCodedStartStop(id, 2))
    val plain = Mp3Codec.decodeSpectra(Mp3Codec.synthesizeCoded(id, 2))
    assert(out.size == 4 && plain.size == 4)
    out.zip(plain).foreach { case (ss, lg) =>
      // granule 0 = START (1), granule 1 = STOP (3); same recipe, same
      // requantized lines (windows only differ in the time domain)
      assert(ss.info.blockType == (if (ss.granule == 0) 1 else 3))
      assert(ss.info.region0Count == 7 && ss.info.region1Count == 36)
      assert(ss.is.toSeq == lg.is.toSeq)
      assert(ss.xr.toSeq == lg.xr.toSeq)
    }
    // the ISO §2.4.3.4.10.3 closed forms, written out independently
    val w0 = Mp3Codec.imdctWindow(0)
    val w1 = Mp3Codec.imdctWindow(1)
    val w3 = Mp3Codec.imdctWindow(3)
    (0 until 36).foreach { i =>
      assert(w0(i) == StrictMath.sin(StrictMath.PI / 36.0 * (i + 0.5)))
    }
    (0 until 18).foreach(i => assert(w1(i) == w0(i), s"start head $i"))
    (18 until 24).foreach(i => assert(w1(i) == 1.0, s"start flat $i"))
    (24 until 30).foreach(i =>
      assert(w1(i) == StrictMath.sin(StrictMath.PI / 12.0 * (i - 18 + 0.5))))
    (30 until 36).foreach(i => assert(w1(i) == 0.0, s"start zero $i"))
    (0 until 6).foreach(i => assert(w3(i) == 0.0, s"stop zero $i"))
    (6 until 12).foreach(i =>
      assert(w3(i) == StrictMath.sin(StrictMath.PI / 12.0 * (i - 6 + 0.5))))
    (12 until 18).foreach(i => assert(w3(i) == 1.0, s"stop flat $i"))
    (18 until 36).foreach(i => assert(w3(i) == w0(i), s"stop tail $i"))
    // start/stop tails splice against the short window: w1's descent is
    // the short sine's second half, w3's ascent its first half
    val short = Array.tabulate(12)(j => StrictMath.sin(StrictMath.PI / 12.0 * (j + 0.5)))
    (0 until 6).foreach(j => assert(w1(24 + j) == short(6 + j)))
    (0 until 6).foreach(j => assert(w3(6 + j) == short(j)))
    // the subband stage accepts the whole long family and the windows
    // are load-bearing: type-1/3 output differs from type-0 output
    val sbSS = Mp3Codec.decodeSubbands(Mp3Codec.synthesizeCodedStartStop(id, 1))
    val sbLG = Mp3Codec.decodeSubbands(Mp3Codec.synthesizeCoded(id, 1))
    assert(sbSS.size == 2 && sbLG.size == 2)
    assert(sbSS.zip(sbLG).exists { case (a, b) =>
      (0 until 32).exists(s => a.samples(s).toSeq != b.samples(s).toSeq)
    }, "start/stop windows must change the time-domain output")
  }

  test("intensity stereo: decode equals hand-panning the mid channel; " +
    "irrational is_pos ratios follow tan(is_pos·π/12); illegal 7 passes through") {
    val id = 13L
    val seed = Mp3Codec.MsSideSeed
    val sfbL = Mp3Codec.SfbLong(44100)
    // the two coded channels decoded independently via mono twins
    def mono(rid: Long, bp: Int, bq: Int): Seq[Mp3Codec.GranuleDecode] = {
      // rebuild each granule's xr from the recipe directly (mono
      // synthesizer has fixed base sizes, so replay by hand)
      (0 until 2).flatMap { f =>
        (0 until 2).map { gr =>
          val rec = Mp3Codec.GranuleRecipe(rid, f, gr, basePairs = bp, baseQuads = bq)
          val xr = new Array[Double](576)
          var h = 0
          def put(line: Int, v: Int): Unit =
            if (v != 0) xr(line) = v * StrictMath.pow(2.0, rec.gainExp.toDouble)
          (0 until rec.nPairs).foreach { p =>
            val (x, y) = rec.pairMag(p); val (sx, sy) = rec.pairSign(p)
            put(h, x * (1 - 2 * sx * x)); put(h + 1, y * (1 - 2 * sy * y))
            h += 2
          }
          (0 until rec.nQuads).foreach { q =>
            val m = rec.quadMag(q)
            (0 until 4).foreach(j =>
              put(h + j, m(j) * (1 - 2 * rec.quadSign(q, j + 1) * m(j))))
            h += 4
          }
          Mp3Codec.GranuleDecode(f, gr, 0, null, null, null, xr)
        }
      }
    }
    def expectPan(alphabet: Array[Int]): Unit = {
      val got = Mp3Codec.decodeSpectra(
        Mp3Codec.synthesizeCodedIntensity(id, 2, seed, alphabet))
      val ch0 = mono(id, 10, 8)
      val ch1 = mono(id + seed, 2, 1)
      assert(got.size == 8)
      got.grouped(2).zipWithIndex.foreach { case (Seq(l, r), k) =>
        val f = k / 2; val gr = k % 2
        val v0 = ch0(k).xr; val v1 = ch1(k).xr
        // bound: ch1's last nonzero line + 1, rounded up to a band start
        var rzero = 576
        while (rzero > 0 && v1(rzero - 1) == 0.0) rzero -= 1
        (0 until 21).foreach { band =>
          val st = sfbL(band); val en = sfbL(band + 1)
          if (st >= rzero) {
            val isPos =
              if (band < 11) 0
              else alphabet(((id + seed + band + f + gr) % alphabet.length).toInt)
            (st until en).foreach { i =>
              if (isPos == 7) {
                assert(l.xr(i) == v0(i) && r.xr(i) == v1(i), s"illegal g$k l$i")
              } else if (isPos == 6) {
                assert(l.xr(i) == v0(i) && r.xr(i) == 0.0, s"left g$k l$i")
              } else if (isPos == 0) {
                assert(l.xr(i) == 0.0 && r.xr(i) == v0(i), s"right g$k l$i")
              } else {
                val ratio = StrictMath.tan(isPos * StrictMath.PI / 12.0)
                assert(l.xr(i) == v0(i) * (ratio / (1.0 + ratio)), s"L g$k l$i")
                assert(r.xr(i) == v0(i) * (1.0 / (1.0 + ratio)), s"R g$k l$i")
              }
            }
          } else {
            (st until en).foreach { i =>
              assert(l.xr(i) == v0(i) && r.xr(i) == v1(i), s"below-bound g$k l$i")
            }
          }
        }
      }
    }
    expectPan(Mp3Codec.IsPosAlphabet) // the oracle-gated exact alphabet
    expectPan(Array(1, 2, 3, 4, 5)) // the irrational tan ratios
    expectPan(Array(7)) // every band illegal → full pass-through
  }

  test("MS joint stereo: decode equals hand-matrixing the two coded channels") {
    val id = 11L
    val ms = Mp3Codec.decodeSpectra(Mp3Codec.synthesizeCodedMs(id, 2))
    // the coded channels, decoded independently via the mono recipe twins
    val mid = Mp3Codec.decodeSpectra(Mp3Codec.synthesizeCoded(id, 2))
    val side = Mp3Codec.decodeSpectra(
      Mp3Codec.synthesizeCoded(id + Mp3Codec.MsSideSeed, 2))
    assert(ms.size == 8 && mid.size == 4 && side.size == 4)
    val sqrt2 = StrictMath.sqrt(2.0)
    for (k <- 0 until 4) {
      val l = ms(2 * k); val r = ms(2 * k + 1)
      assert(l.channel == 0 && r.channel == 1)
      val m = mid(k).xr; val s = side(k).xr
      (0 until 576).foreach { j =>
        assert(l.xr(j) == (m(j) + s(j)) / sqrt2, s"L g$k line $j")
        assert(r.xr(j) == (m(j) - s(j)) / sqrt2, s"R g$k line $j")
      }
      // side info rides per CODED channel
      assert(l.info.globalGain == mid(k).info.globalGain)
      assert(r.info.globalGain == side(k).info.globalGain)
    }
    // cancellation path: with SIDE == MID (sideSeed 0) the right channel
    // must cancel to EXACT zeros while the left is √2·M — the output
    // spectrum diverging from the coded lines is the point of MS
    val eq = Mp3Codec.decodeSpectra(Mp3Codec.synthesizeCodedMs(id, 1, sideSeed = 0L))
    assert(eq.size == 4)
    val sqrt2b = StrictMath.sqrt(2.0)
    eq.grouped(2).zipWithIndex.foreach { case (Seq(l, r), k) =>
      assert(r.xr.forall(_ == 0.0), s"R granule $k should cancel")
      (0 until 576).foreach(j =>
        assert(l.xr(j) == (mid(k).xr(j) + mid(k).xr(j)) / sqrt2b))
      assert(r.is.exists(_ != 0), "coded side lines were set — output-only zero")
    }
  }

  test("region boundaries use the stream's sample-rate band table (48 kHz)") {
    // hand-built 48 kHz mono frame whose big_values REGION SPLIT is the
    // load-bearing bit: 22 pairs with table_select (1, 0, 0) and
    // region0_count 8 → region 0 ends at sfb48(9) = line 42 (the 44.1 kHz
    // table would say 44). Pairs 0–20 (lines 0–41) are table-1 (1,0)
    // codes, pair 21 (lines 42–43) falls in region 1 = table 0 = ZERO
    // bits. A decoder still on the 44.1 kHz table would read pair 21
    // through table 1 and overrun part2_3_length.
    val w = new java.io.ByteArrayOutputStream()
    var cur = 0; var n = 0
    def bits(v: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        cur = (cur << 1) | ((v >> i) & 1); n += 1
        if (n == 8) { w.write(cur); cur = 0; n = 0 }
        i -= 1
      }
    }
    // header: MPEG-1 Layer III, no CRC, 32 kbps, 48 kHz, mono → 96 bytes
    w.write(0xFF); w.write(0xFB); w.write(0x14); w.write(0xC0)
    // side info: mdb 0, private 5, scfsi 4
    bits(0, 9); bits(0, 5); bits(0, 4)
    // granule 0: 21 table-1 pairs à "01"+sign = 63 bits
    bits(63, 12); bits(22, 9); bits(210, 8); bits(0, 4)
    bits(0, 1) // long blocks
    bits(1, 5); bits(0, 5); bits(0, 5) // table_select (1, 0, 0)
    bits(8, 4); bits(7, 3) // region0_count 8, region1_count 7
    bits(0, 1); bits(0, 1); bits(1, 1)
    // granule 1: empty
    bits(0, 12); bits(0, 9); bits(210, 8); bits(0, 4)
    bits(0, 1); bits(0, 5); bits(0, 5); bits(0, 5)
    bits(0, 4); bits(0, 3); bits(0, 1); bits(0, 1); bits(1, 1)
    assert(n == 0 && w.size() == 4 + 17)
    // main data: 21 × ("01" + positive sign "0")
    (0 until 21).foreach { _ => bits(1, 2); bits(0, 1) }
    if (n > 0) bits(0, 8 - n)
    while (w.size() < 96) w.write(0)
    val out = Mp3Codec.decodeSpectra(w.toByteArray)
    assert(out.size == 2)
    val g0 = out.head
    (0 until 42).foreach { i =>
      assert(g0.is(i) == (if (i % 2 == 0) 1 else 0), s"line $i")
    }
    (42 until 576).foreach(i => assert(g0.is(i) == 0, s"line $i"))
    assert(g0.xr(0) == 1.0) // gain 210, sf 0
  }

  test("lines above sfb 20 requantize with sf = 0 even when preflag is set") {
    // 44.1 kHz mono frame, preflag 1, 288 pairs spanning all 576 lines:
    // table_select (0, 0, 1) with regions split at sfb(15)=134 and
    // sfb(20)=342 — so regions 0/1 are table-0 zeros (no bits) and
    // region 2 (lines 342+) is table 1. Two nonzero lines: 342 (band 20,
    // pretab 2 → scale 2^-1) and 418 (ABOVE the last scalefactor band →
    // scale must be 2^0 = 1, not band 20's 0.5).
    val w = new java.io.ByteArrayOutputStream()
    var cur = 0; var n = 0
    def bits(v: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        cur = (cur << 1) | ((v >> i) & 1); n += 1
        if (n == 8) { w.write(cur); cur = 0; n = 0 }
        i -= 1
      }
    }
    w.write(0xFF); w.write(0xFB); w.write(0x10); w.write(0xC0) // 44.1 kHz, 104 B
    bits(0, 9); bits(0, 5); bits(0, 4)
    // pairs 171..287 are region 2 (table 1): two (1,0)+sign at pairs 171
    // (line 342) and 209 (line 418), the rest (0,0) "1" → 2·3 + 115·1
    bits(121, 12); bits(288, 9); bits(210, 8); bits(0, 4)
    bits(0, 1)
    bits(0, 5); bits(0, 5); bits(1, 5) // table_select (0, 0, 1)
    bits(14, 4); bits(4, 3) // regions end at sfb(15)=134 and sfb(20)=342
    bits(1, 1) // PREFLAG on
    bits(0, 1); bits(1, 1)
    bits(0, 12); bits(0, 9); bits(210, 8); bits(0, 4)
    bits(0, 1); bits(0, 5); bits(0, 5); bits(0, 5)
    bits(0, 4); bits(0, 3); bits(0, 1); bits(0, 1); bits(1, 1)
    assert(n == 0 && w.size() == 4 + 17)
    (171 until 288).foreach { p =>
      if (p == 171 || p == 209) { bits(1, 2); bits(0, 1) } // (1,0) +
      else bits(1, 1) // (0,0)
    }
    if (n > 0) bits(0, 8 - n)
    while (w.size() < 104) w.write(0)
    val g0 = Mp3Codec.decodeSpectra(w.toByteArray).head
    assert(g0.is(342) == 1 && g0.is(418) == 1)
    assert(g0.xr(342) == 0.5, "band 20: preflag pretab 2 → 2^(-0.5·2)")
    assert(g0.xr(418) == 1.0, "above sfb 20: no scalefactor, no pretab")
  }

  test("extractMp3Spectra: granule rows match the recipe end to end on a sample") {
    val docs = spark.range(0, 6).toDF("doc_id")
    val out = Multimodal.extractMp3Spectra(
      Multimodal.synthesizeMp3Coded(docs, "doc_id", nFrames = 2))
      .orderBy("media_id", "frame_idx", "granule").collect()
    assert(out.length == 24) // 6 docs × 2 frames × 2 granules
    out.foreach { r =>
      val (id, f, gr) = (r.getLong(0), r.getLong(1).toInt, r.getLong(2).toInt)
      assert(r.getLong(3) == 0L, "mono: channel 0")
      val rec = Mp3Codec.GranuleRecipe(id, f, gr)
      assert(r.getLong(4) == rec.nPairs.toLong, "big_values")
      assert(r.getLong(5) == 210L + 4 * rec.gainExp, "global_gain")
      assert(r.getLong(6) == rec.part23Length.toLong, "part2_3_length")
      val nnz = (0 until rec.nPairs).map { p =>
        val (x, y) = rec.pairMag(p); x + y
      }.sum + (0 until rec.nQuads).map(q => rec.quadMag(q).sum).sum
      assert(r.getLong(7) == nnz.toLong, "n_nonzero")
      assert(r.getLong(8) == nnz.toLong * (1L << rec.gainExp) * 1000000L, "sum_abs")
    }
  }
}
