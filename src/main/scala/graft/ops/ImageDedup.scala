package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Perceptual image dedup: difference-hash (dHash) + banded Hamming
  * self-join — the LAION-style near-duplicate screen for image corpora.
  *
  * The reference engine (fideus-labs/ngff-zarr) stops at pixel I/O;
  * this module adds the training-data op a 100 TB image corpus needs:
  * a 64-bit perceptual fingerprint per image (computed at decode time,
  * partition-local, no shuffle) and a near-dup pair join that only
  * shuffles 4 16-bit band keys per image — never pixels, never a
  * cartesian. Recall is exact for the verified radius: with 4 bands a
  * pair within Hamming distance 3 must agree on at least one band
  * (pigeonhole), so banded candidates ⊇ true pairs and the popcount
  * verify makes the result EQUAL to the brute-force Hamming-≤-k set.
  *
  * dHash (Krawetz): area-average the integer luma (299·R+587·G+114·B)
  * onto a 9×8 grid, then bit(r,c) = [avg(r,c) < avg(r,c+1)] for the 8
  * horizontal comparisons per row — 64 bits. Comparisons are exact:
  * averages compare via cross-multiplied sums (sumL·nR < sumR·nL), so
  * no float rounding enters the hash and a SQL oracle can replay it.
  */
object ImageDedup {

  val GridW = 9 // columns (9 cells -> 8 horizontal comparisons)
  val GridH = 8 // rows

  /** 64-bit difference hash of a decoded image. Bit index r*8+c is set
    * when cell (r,c) is strictly darker than its right neighbor
    * (cross-multiplied integer compare — exact for any image size;
    * cells are the same source boxes [[Multimodal.thumbnail]] uses).
    */
  def dHash(img: Multimodal.DecodedImage): Long = {
    val w = img.width; val h = img.height; val ch = img.channels
    require(w > 0 && h > 0, s"empty image ${w}x$h")
    // luma weights per channel position: gray = 1000*v for 1-channel,
    // 299/587/114 for RGB (extra channels, e.g. alpha, weigh 0)
    val lw: Array[Int] =
      if (ch == 1) Array(1000)
      else Array.tabulate(ch)(c => if (c == 0) 299 else if (c == 1) 587 else if (c == 2) 114 else 0)
    val sums = new Array[Long](GridH * GridW)
    val counts = new Array[Long](GridH * GridW)
    var ty = 0
    while (ty < GridH) {
      val y0 = ty * h / GridH
      val y1 = math.max(y0 + 1, (ty + 1) * h / GridH)
      var tx = 0
      while (tx < GridW) {
        val x0 = tx * w / GridW
        val x1 = math.max(x0 + 1, (tx + 1) * w / GridW)
        var s = 0L
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) {
            val base = (y * w + x) * ch
            var c = 0
            var g = 0
            while (c < ch) { g += (img.pixels(base + c) & 0xff) * lw(c); c += 1 }
            s += g
            x += 1
          }
          y += 1
        }
        sums(ty * GridW + tx) = s
        counts(ty * GridW + tx) = (y1 - y0).toLong * (x1 - x0)
        tx += 1
      }
      ty += 1
    }
    var hash = 0L
    var r = 0
    while (r < GridH) {
      var c = 0
      while (c < GridW - 1) {
        val l = r * GridW + c
        // avgL < avgR  <=>  sumL*nR < sumR*nL (exact in Long: sums are
        // <= 255*1000*npix and counts are small)
        if (sums(l) * counts(l + 1) < sums(l + 1) * counts(l))
          hash |= 1L << (r * (GridW - 1) + c)
        c += 1
      }
      r += 1
    }
    hash
  }

  /** Distributed dHash over (doc_id, media) — decode + hash per
    * partition, one 8-byte fingerprint out per image. At corpus scale
    * this runs inside the ingest scan; nothing shuffles here.
    */
  def hashes(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.select(col("doc_id"), col("media")).as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, payload) =>
        (id, dHash(Multimodal.decodeImage(payload)))
      }).toDF("doc_id", "dhash")
  }

  /** Near-duplicate pairs within `maxHamming` bits, found by a banded
    * self-join: each hash splits into `bands` contiguous words; pairs
    * sharing (band index, word) become candidates; an exact popcount
    * on the XOR verifies. `maxHamming < bands` guarantees full recall
    * (a pair with <= maxHamming differing bits leaves >= one band
    * untouched), so the output equals the brute-force Hamming join.
    *
    * Scale shape: 4 rows/image into one shuffle keyed by 16-bit words
    * — flat or letterboxed images can pile into hot buckets exactly
    * like boilerplate text in MinHash-LSH; the same remedies apply
    * (exact-collapse identical hashes first — a zero-XOR clique —
    * or salt the hot band keys as [[TextDedup]] does).
    *
    * Output: (doc_a, doc_b, hamming, hash_a, hash_b), doc_a < doc_b.
    */
  def nearDupPairs(hashes: DataFrame, maxHamming: Int = 3, bands: Int = 4): DataFrame = {
    require(bands > 0 && 64 % bands == 0, s"bands must divide 64, got $bands")
    require(maxHamming < bands,
      s"banded recall needs maxHamming < bands (pigeonhole), got $maxHamming >= $bands")
    val width = 64 / bands
    val mask = (1L << width) - 1
    val banded = hashes.select(col("doc_id"), col("dhash"),
      explode(array((0 until bands).map(i =>
        struct(lit(i).as("band"),
          (shiftrightunsigned(col("dhash"), i * width).bitwiseAND(mask)).as("word"))): _*))
        .as("bw"))
      .select(col("doc_id"), col("dhash"), col("bw.band"), col("bw.word"))
    val a = banded.select(col("doc_id").as("doc_a"), col("dhash").as("hash_a"),
      col("band"), col("word"))
    val b = banded.select(col("doc_id").as("doc_b"), col("dhash").as("hash_b"),
      col("band"), col("word"))
    a.join(b, Seq("band", "word"))
      .filter(col("doc_a") < col("doc_b"))
      // radius filter as a join-condition predicate (Catalyst pushes
      // it into the join either way — r12's verdict showed the before
      // plan already had it there) and, crucially, NOT as a distinct
      // key: the r12 form carried `hamming` as a fifth distinct
      // column, widening the dedup exchange for a value that is a
      // pure function of (hash_a, hash_b). Dedup on the original four
      // columns and recompute the popcount per DISTINCT pair after.
      .filter(expr("bit_count(hash_a ^ hash_b)") <= maxHamming)
      .select(col("doc_a"), col("doc_b"), col("hash_a"), col("hash_b"))
      .distinct() // a pair may share several bands
      .withColumn("hamming", expr("bit_count(hash_a ^ hash_b)"))
      .select(col("doc_a"), col("doc_b"), col("hamming"), col("hash_a"), col("hash_b"))
  }

  /** Unsigned hex rendering of a 64-bit hash column (sign-safe on both
    * engines: two 32-bit halves).
    */
  def hashHex(h: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    format_string("%08x%08x", shiftrightunsigned(h, 32),
      h.bitwiseAND(0xFFFFFFFFL))

  /** Image duplicate clusters with EXACT-COLLAPSE first — the
    * [[TextDedup.collapsedNearDupClusters]] lesson applied to images:
    * byte-identical images (and distinct images with equal hashes —
    * logos, letterboxes, thumbnails repeated millions of times in a
    * crawl) form a zero-XOR clique whose C(B,2) pairs must never
    * materialize. One representative (min doc id) per DISTINCT hash
    * enters the banded join; components computed on reps; every doc
    * inherits its representative's cluster.
    *
    * The partition is provably identical to the direct path: equal
    * hashes ⇒ equal band words and equal Hamming distances to every
    * other hash, so quotienting by the zero-distance clique preserves
    * connectivity, and the component's min rep id IS the expanded
    * cluster's min doc id (reps are per-hash minima).
    *
    * Output: (doc_id, rep_id, cluster_id).
    */
  def dupClusters(hashes: DataFrame, maxHamming: Int = 3, bands: Int = 4): DataFrame = {
    val reps = hashes.groupBy(col("dhash")).agg(min(col("doc_id")).as("rep_id"))
    val mem = hashes.join(reps, "dhash").select(col("doc_id"), col("rep_id"))
    val repHashes = reps.select(col("rep_id").as("doc_id"), col("dhash"))
    val pairs = nearDupPairs(repHashes, maxHamming, bands)
      .select(col("doc_a"), col("doc_b"))
    val cc = TextDedup.connectedComponents(pairs, repHashes.select(col("doc_id")))
    mem.join(cc.select(col("doc_id").as("rep_id"), col("cluster_id")), "rep_id")
      .select(col("doc_id"), col("rep_id"), col("cluster_id"))
  }
}
