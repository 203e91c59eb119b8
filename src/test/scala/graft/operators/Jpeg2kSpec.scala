package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Jpeg2k against committed fixtures from `tools/make_j2k_fixture.py`
  * — encodings by the independent pure-Python T.800 implementation
  * (`tools/j2k.py`, itself roundtrip-self-tested), so bit-exact
  * agreement is two separate readings of the published spec: MQ
  * coder, EBCOT Tier-1, tag-tree packet headers, 5/3 lifting.
  */
class Jpeg2kSpec extends AnyFunSuite {

  private val fx = "src/test/resources/fixtures/j2k"

  private def bytes(name: String): Array[Byte] =
    java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(s"$fx/$name"))

  private def raw(name: String, prec: Int): Seq[Int] = {
    val b = bytes(name)
    if (prec > 8) b.grouped(2).map(p => ((p(0) & 0xff) << 8) | (p(1) & 0xff)).toSeq
    else b.map(_ & 0xff).toSeq
  }

  private def check(name: String, w: Int, h: Int, prec: Int): Unit = {
    val img = Jpeg2k.decode(bytes(s"$name.j2c"))
    assert((img.width, img.height, img.precision) == ((w, h, prec)), name)
    assert(img.samples.toSeq == raw(s"$name.raw", prec), name)
  }

  test("8-bit, 1 level, single code-blocks")(check("g8_l1", 19, 13, 8))
  test("8-bit, 3 levels, 16x16 code-block grids")(check("g8_l3", 37, 29, 8))
  test("12-bit, 2 levels")(check("g12_l2", 24, 16, 12))
  test("16-bit full range, 2 levels")(check("g16_l2", 11, 9, 16))
  test("constant image: empty-packet path")(check("flat_l2", 32, 32, 8))

  test("lossy 9/7 expounded quantization decodes bit-identically to the Python decoder")(
    check("lossy97_exp", 33, 25, 8))
  test("lossy 9/7 scalar-derived quantization, 12-bit")(
    check("lossy97_der", 24, 16, 12))
  test("multi-tile lossless with odd tile origins decodes exactly")(
    check("tiles53", 45, 33, 8))
  test("precinct partitions + SOP/EPH + three tile-parts decode exactly")(
    check("prec_tp", 56, 40, 8))
  test("16-bit lossy with tiles and per-resolution precincts")(
    check("lossy16_tiles", 45, 33, 16))

  test("three quality layers, RLCP progression (pass-granular layer cuts)")(
    check("layers3_rlcp", 42, 31, 8))
  test("RPCL progression + layers + tiles + precincts + SOP/EPH + tile-parts")(
    check("rpcl_tiles", 42, 31, 8))
  test("CPRL progression, four layers, lossy 9/7")(
    check("cprl_lossy", 42, 31, 8))

  test("multi-tile PCRL with unaligned tile origins: B.12 tile-origin clamp")(
    check("pcrl_tiles", 42, 31, 8))
  test("multi-tile CPRL RGB/MCT with unaligned tile origins (B.12 clamp)") {
    val img = Jpeg2k.decode(bytes("cprl_tiles.j2c"))
    assert((img.width, img.height, img.precision, img.components) == ((42, 31, 8, 3)))
    assert(img.samples.toSeq == bytes("cprl_tiles.raw").map(_ & 0xff).toSeq)
  }

  test("canvas offsets: image region at (5,3), tiles clipped (B.3)")(
    check("offs53", 30, 22, 8))
  test("canvas offsets + tile-grid anchor + RPCL + lossy 9/7 + layers")(
    check("offs_rpcl_lossy", 30, 22, 8))

  test("COC per-component code-block sizes + precincts + auto QCC, lossless RCT, tiles") {
    val img = Jpeg2k.decode(bytes("coc53.j2c"))
    assert((img.width, img.height, img.precision, img.components) == ((33, 25, 8, 3)))
    assert(img.samples.toSeq == bytes("coc53.raw").map(_ & 0xff).toSeq)
  }
  test("QCC per-component quantization (expounded + derived) through ICT, RPCL") {
    val img = Jpeg2k.decode(bytes("qcc97.j2c"))
    assert((img.width, img.height, img.precision, img.components) == ((33, 25, 8, 3)))
    assert(img.samples.toSeq == bytes("qcc97.raw").map(_ & 0xff).toSeq)
  }

  test("component subsampling 4:2:0 with tiles + RPCL + layers (B.2 lattices)") {
    val img = Jpeg2k.decode(bytes("sub420.j2c"))
    assert((img.width, img.height, img.precision, img.components) == ((32, 24, 8, 3)))
    assert(img.samples.toSeq == bytes("sub420.raw").map(_ & 0xff).toSeq)
  }
  test("component subsampling 4:2:2, lossy 9/7 with per-component QCC") {
    val img = Jpeg2k.decode(bytes("sub422_lossy.j2c"))
    assert((img.width, img.height, img.precision, img.components) == ((33, 25, 8, 3)))
    assert(img.samples.toSeq == bytes("sub422_lossy.raw").map(_ & 0xff).toSeq)
  }

  test("code-block style BYPASS+CAUSAL+SEGSYM: raw segments, layer cuts, tiles")(
    check("cbsty_bypass", 37, 29, 12))
  test("code-block style RESTART+RESET: per-pass terminated MQ, lossy RPCL")(
    check("cbsty_restart", 37, 29, 12))

  test("RGN maxshift ROI: shifted coefficients scale back exactly (Annex H)")(
    check("rgn_roi", 33, 25, 8))
  test("POC progression order changes: three segments cover the packet space") {
    val img = Jpeg2k.decode(bytes("poc_mixed.j2c"))
    assert((img.width, img.height, img.precision, img.components) == ((33, 25, 8, 3)))
    assert(img.samples.toSeq == bytes("poc_mixed.raw").map(_ & 0xff).toSeq)
  }

  test("PPT packed packet headers: tile-part segments + SOP/EPH split")(
    check("ppt_hdrs", 33, 25, 8))
  test("PPM packed packet headers: main-header Nppm chunks, RPCL, 3 tile-parts")(
    check("ppm_hdrs", 33, 25, 8))

  test("tile-scope COD: per-tile cb size/precincts/progression/layers/styles")(
    check("tilecod", 33, 25, 8))
  test("tile-scope QCD: per-tile quantization overrides under lossy 9/7")(
    check("tileqcd", 33, 25, 8))

  test("combination fuzz corpus: 20 random parameter interactions decode bit-exact") {
    // targeted fixtures pin each feature alone; these pin their
    // INTERACTIONS (tiles x offsets x precincts x layers x
    // progressions x styles x COC x RGN x PPT/PPM, lossless + lossy),
    // every stream Python-roundtripped before committing
    val manifest = new String(bytes("fuzz_manifest.txt"), "UTF-8")
    val rows = manifest.linesIterator.filter(_.nonEmpty).toSeq
    assert(rows.length == 20)
    rows.foreach { row =>
      val Array(name, w, h, prec, _) = row.split(" ")
      check(name, w.toInt, h.toInt, prec.toInt)
    }
  }

  test("PCRL progression, two layers, RGB/MCT decodes exactly") {
    val img = Jpeg2k.decode(bytes("pcrl_rgb_layers.j2c"))
    assert((img.width, img.height, img.precision, img.components) == ((42, 31, 8, 3)))
    assert(img.samples.toSeq == bytes("pcrl_rgb_layers.raw").map(_ & 0xff).toSeq)
  }

  test("lossy RGB through the irreversible color transform (ICT)") {
    val img = Jpeg2k.decode(bytes("lossy_rgb_ict.j2c"))
    assert((img.width, img.height, img.precision, img.components) == ((37, 26, 8, 3)))
    assert(img.samples.toSeq == bytes("lossy_rgb_ict.raw").map(_ & 0xff).toSeq)
  }

  test("RGB with the reversible color transform (MCT) decodes exactly") {
    val img = Jpeg2k.decode(bytes("rgb_mct.j2c"))
    assert((img.width, img.height, img.precision, img.components) == ((21, 11, 8, 3)))
    assert(img.samples.toSeq == bytes("rgb_mct.raw").map(_ & 0xff).toSeq)
  }

  private def lcg(seed: Long): Iterator[Int] =
    Iterator.iterate(seed)(s => (s * 1103515245L + 12345L) & 0x7fffffffL)
      .drop(1).map(_.toInt)

  test("Scala encoder roundtrips: sizes, precisions, levels, code-blocks") {
    for ((w, h, prec, levels, cb, seed) <- Seq(
        (8, 8, 8, 1, 4, 1L), (13, 9, 8, 2, 8, 2L), (32, 24, 12, 2, 16, 3L),
        (21, 17, 16, 3, 8, 4L), (64, 48, 8, 2, 32, 5L), (1, 1, 8, 1, 4, 6L))) {
      val r = lcg(seed)
      val img = Array.tabulate(w * h)(_ => math.abs(r.next()) % (1 << prec))
      val dec = Jpeg2k.decode(Jpeg2kEncode.encode(Seq(img), w, h, prec,
        levels = levels, cbw = cb, cbh = cb))
      assert(dec.samples.toSeq == img.toSeq, s"${w}x$h@$prec L$levels cb$cb")
    }
  }

  test("Scala encoder roundtrips: signed component and RGB with/without MCT") {
    val r = lcg(21L)
    val simg = Array.tabulate(11 * 9)(_ => (math.abs(r.next()) % 256) - 128)
    val sdec = Jpeg2k.decode(Jpeg2kEncode.encode(Seq(simg), 11, 9, 8,
      signed = true, levels = 2, cbw = 8, cbh = 8))
    assert(sdec.signed && sdec.samples.toSeq == simg.toSeq)
    for (mct <- Seq(false, true)) {
      val r2 = lcg(if (mct) 31L else 32L)
      val planes = Seq.fill(3)(Array.tabulate(21 * 11)(_ => math.abs(r2.next()) % 256))
      val dec = Jpeg2k.decode(Jpeg2kEncode.encode(planes, 21, 11, 8,
        levels = 2, cbw = 8, cbh = 8, mct = mct))
      val want = Array.tabulate(21 * 11 * 3)(i => planes(i % 3)(i / 3))
      assert(dec.components == 3 && dec.samples.toSeq == want.toSeq, s"mct=$mct")
    }
  }

  test("SOP and EPH marker segments roundtrip") {
    val r = lcg(41L)
    val img = Array.tabulate(23 * 15)(_ => math.abs(r.next()) % 256)
    for ((sop, eph) <- Seq((true, false), (false, true), (true, true))) {
      val dec = Jpeg2k.decode(Jpeg2kEncode.encode(Seq(img), 23, 15, 8,
        levels = 2, cbw = 8, cbh = 8, sop = sop, eph = eph))
      assert(dec.samples.toSeq == img.toSeq, s"sop=$sop eph=$eph")
    }
  }

  test("tile-part header refusals: unknown markers and per-tile levels") {
    val good = bytes("g8_l1.j2c")
    val sot = good.indices.find(i => (good(i) & 0xff) == 0xff &&
      (good(i + 1) & 0xff) == 0x90).get
    def splice(seg: Array[Byte]): Array[Byte] = {
      val out = good.take(sot + 12) ++ seg ++ good.drop(sot + 12)
      val psot = ((good(sot + 6) & 0xff) << 24) | ((good(sot + 7) & 0xff) << 16) |
        ((good(sot + 8) & 0xff) << 8) | (good(sot + 9) & 0xff)
      val p2 = psot + seg.length
      out(sot + 6) = ((p2 >> 24) & 0xff).toByte
      out(sot + 7) = ((p2 >> 16) & 0xff).toByte
      out(sot + 8) = ((p2 >> 8) & 0xff).toByte
      out(sot + 9) = (p2 & 0xff).toByte
      out
    }
    // a tile-header marker the walker does not know (RGN) refuses
    val rgn = Array[Byte](0xff.toByte, 0x5e, 0, 5, 0, 0, 4)
    val e1 = intercept[UnsupportedOperationException](
      Jpeg2k.decode(splice(rgn)))
    assert(e1.getMessage.contains("tile-part header marker 0xFF5E"))
    // a tile COD changing the decomposition levels refuses by name
    // (g8_l1 is 1 level; this tile COD declares 3)
    val cod = Array[Byte](0xff.toByte, 0x52, 0, 12, 0, 0, 0, 1, 0, 3, 2, 2, 0, 1)
    val e2 = intercept[IllegalArgumentException](Jpeg2k.decode(splice(cod)))
    assert(e2.getMessage.contains("per-tile decomposition levels"))
  }

  test("COC with per-component levels or transform refuses by name") {
    // a COC whose levels differ from the COD is encoder exotica this
    // decoder refuses rather than mis-decoding (ragged resolutions)
    val good = bytes("g8_l1.j2c")   // 1 level, lossless
    val sot = good.indices.find(i => (good(i) & 0xff) == 0xff &&
      (good(i + 1) & 0xff) == 0x90).get
    // Lcoc=9: Ccoc=0, Scoc=0, levels=3, xcb, ycb, style, transform=1
    val cocLv = Array[Byte](0xff.toByte, 0x53, 0, 9, 0, 0, 3, 2, 2, 0, 1)
    val e1 = intercept[IllegalArgumentException](
      Jpeg2k.decode(good.take(sot) ++ cocLv ++ good.drop(sot)))
    assert(e1.getMessage.contains("per-component decomposition levels"))
    // transform=0 (9/7) against a 5/3 COD
    val cocTr = Array[Byte](0xff.toByte, 0x53, 0, 9, 0, 0, 1, 2, 2, 0, 0)
    val e2 = intercept[IllegalArgumentException](
      Jpeg2k.decode(good.take(sot) ++ cocTr ++ good.drop(sot)))
    assert(e2.getMessage.contains("per-component transform"))
  }

  test("Scala encoder CAUSAL+SEGSYM styles roundtrip losslessly through the decoder") {
    val r = lcg(41)
    for ((w, h) <- Seq((11, 7), (19, 13), (32, 24))) {
      val img = Array.tabulate(w * h)(i =>
        ((i % w) * 3 + (i / w) * 7 + math.abs(r.next()) % 31) % 256)
      for (sty <- Seq(0x08, 0x20, 0x28)) {
        val enc = Jpeg2kEncode.encode(Seq(img), w, h, 8,
          levels = 2, cbw = 8, cbh = 8, cbstyle = sty)
        val dec = Jpeg2k.decode(enc)
        assert(dec.samples.toSeq == img.toSeq, s"${w}x$h style 0x$sty%02X")
      }
    }
    // unimplemented encode-side styles refuse by name
    val e = intercept[IllegalArgumentException](
      Jpeg2kEncode.encode(Seq(Array.fill(16)(7)), 4, 4, 8, cbstyle = 0x01))
    assert(e.getMessage.contains("CAUSAL|SEGSYM"))
  }

  test("Scala lossy encoder (9/7 + expounded quant) roundtrips within quantizer error") {
    for ((w, h, prec, e0, mu, tol, seed) <- Seq(
        (32, 24, 8, 8, 0, 4, 31L),      // step 1: near-lossless
        (21, 17, 8, 6, 1024, 16, 32L),  // step 6: visibly lossy
        (24, 16, 12, 12, 512, 6, 33L),  // 12-bit
        (19, 13, 16, 16, 0, 4, 34L))) { // 16-bit, step 1
      val r = lcg(seed)
      // smooth-ish content (ramps + small noise), the shape lossy
      // codecs are specified over
      val img = Array.tabulate(w * h) { i =>
        val x = i % w; val y = i / w
        math.min((1 << prec) - 1, (x * 3 + y * 5) % (1 << prec) / 2 +
          math.abs(r.next()) % 8)
      }
      val enc = Jpeg2kEncode.encode(Seq(img), w, h, prec, levels = 2,
        cbw = 8, cbh = 8, transform = "97", quant = Some((e0, mu)))
      val dec = Jpeg2k.decode(enc)
      val err = img.indices.map(i => math.abs(dec.samples(i) - img(i))).max
      assert(err <= tol, s"${w}x$h@$prec e0=$e0 mu=$mu: max err $err")
      // decode is deterministic
      assert(Jpeg2k.decode(enc).samples.toSeq == dec.samples.toSeq)
    }
  }

  test("Scala lossy encoder: RGB through the irreversible color transform") {
    val r = lcg(41L)
    val w = 16; val h = 12
    val planes = (0 until 3).map(c => Array.tabulate(w * h) { i =>
      val x = i % w; val y = i / w
      math.min(255, (x * (3 + c) + y * (5 - c)) % 128 + 64 + math.abs(r.next()) % 6)
    })
    val enc = Jpeg2kEncode.encode(planes, w, h, 8, levels = 2, cbw = 8,
      cbh = 8, mct = true, transform = "97", quant = Some((8, 0)))
    val dec = Jpeg2k.decode(enc)
    assert(dec.components == 3)
    val err = (for (i <- 0 until w * h; c <- 0 until 3)
      yield math.abs(dec.samples(i * 3 + c) - planes(c)(i))).max
    assert(err <= 6, s"ICT roundtrip max err $err")
  }

  test("truncated codestreams throw at every quartile cut, never return garbage") {
    // loud-refusal posture under damage: any prefix cut must surface
    // an exception (require/EOF), not silently-wrong pixels
    for (name <- Seq("g8_l3", "tiles53", "prec_tp", "lossy97_exp",
        "layers3_rlcp", "rpcl_tiles",
        // the r12 marker/style surfaces keep the same posture
        "cbsty_bypass", "coc53", "sub420", "offs53", "rgn_roi",
        "poc_mixed", "ppt_hdrs", "ppm_hdrs", "tilecod", "tileqcd")) {
      val good = bytes(s"$name.j2c")
      for (q <- Seq(1, 2, 3)) {
        val cut = good.take(good.length * q / 4)
        assertThrows[Exception](Jpeg2k.decode(cut))
      }
    }
  }

  test("refusals: transform/quant mismatch, bad progression, code-block style, truncation") {
    val good = bytes("g8_l1.j2c")
    def findMarker(m: Int): Int =
      good.indices.find(i => (good(i) & 0xff) == 0xff &&
        (good(i + 1) & 0xff) == (m & 0xff)).get
    val cod = findMarker(0x52)
    val codLen = ((good(cod + 2) & 0xff) << 8) | (good(cod + 3) & 0xff)
    // declaring the 9/7 transform (byte 0, T.800 A.20) while QCD
    // stays style 0 (no quantization) is contradictory — refused
    val irr = good.clone()
    irr(cod + 2 + codLen - 1) = 0
    val e1 = intercept[IllegalArgumentException](Jpeg2k.decode(irr))
    assert(e1.getMessage.contains("contradicts"))
    val badProg = good.clone()
    badProg(cod + 5) = 5 // not one of the five progression orders
    val e2 = intercept[IllegalArgumentException](Jpeg2k.decode(badProg))
    assert(e2.getMessage.contains("progression"))
    val styled = good.clone()
    styled(cod + 12) = 0x40 // reserved style bit — not in Table A.19
    val e3 = intercept[IllegalArgumentException](Jpeg2k.decode(styled))
    assert(e3.getMessage.contains("code-block style"))
    val siz = findMarker(0x51)
    val multi = good.clone()
    multi(siz + 39) = 2 // Csiz = 2: neither gray nor RGB — refused
    assertThrows[IllegalArgumentException](Jpeg2k.decode(multi))
    assertThrows[Exception](Jpeg2k.decode(good.take(good.length / 2)))
  }
}
