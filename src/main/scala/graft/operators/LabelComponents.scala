package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.meta.Model.ImageMeta
import graft.zarr.ZarrStore

/** Distributed connected-component labeling over the chunk table —
  * the segmentation-mask analysis step downstream of the reference's
  * label-image pyramids (`py/ngff_zarr/methods/_support.py` routes
  * label images to nearest/mode downsamplers; counting and measuring
  * the labeled objects is what those pyramids exist FOR).
  *
  * Scale shape (the textbook block-partitioned CCL decomposition):
  *
  *  1. Per chunk, ONE pass labels foreground voxels 4-connectively
  *     with a dense array union-find (local linear indices — no
  *     hashing, ~9 bytes/voxel peak). Each local fragment is named by
  *     the GLOBAL linear index of its minimum voxel, so fragment ids
  *     are unique across chunks without coordination.
  *  2. Only two things leave the task: per-fragment partial stats
  *     (one row per fragment per chunk) and boundary cells — the
  *     foreground voxels on chunk faces, O(perimeter) not O(volume).
  *  3. Cross-chunk adjacency is TWO equi-joins of the boundary-cell
  *     table with itself (right neighbor, down neighbor) — never a
  *     voxel-level shuffle of chunk interiors.
  *  4. The fragment graph (edges ≪ voxels) runs through
  *     [[graft.ops.TextDedup.connectedComponents]] — the same
  *     two-stage union-find / min-label propagation machinery the
  *     dedup clustering surface uses — and fragment stats re-key onto
  *     the component minimum and aggregate.
  *
  * At 100 TB the shuffled bytes are fragment rows + chunk faces; the
  * volume itself is read once and never moves.
  */
object LabelComponents {

  /** One local fragment's contribution: `kind` 0 = partial stats row,
    * 1 = boundary cell (y/x carry the global voxel position).
    */
  final case class FragRow(kind: Int, plabel: Long, y: Long, x: Long,
      size: Long, ymin: Long, ymax: Long, xmin: Long, xmax: Long, vsum: Long)

  /** Per-component exact stats for a 2D (y, x) image: voxels with
    * `value >= threshold` are foreground, 4-connectivity. Output one
    * row per component: (comp = min global linear index, size, ymin,
    * ymax, xmin, xmax, vsum) — vsum is exact because imaging dtypes
    * here are integral.
    */
  def componentStats2d(spark: SparkSession, ds: Dataset[ChunkOps.ChunkRow],
      meta: ImageMeta, threshold: Double): DataFrame = {
    import spark.implicits._
    require(meta.dims == Seq("y", "x"),
      s"componentStats2d expects a 2D (y, x) image, got ${meta.dims}")
    val width = meta.shape(1)
    val dtype = meta.dtype

    val frags = ds.flatMap { c =>
      val vals = ZarrStore.decodeToDoubles(c.data, dtype)
      val h = c.shape(0); val w = c.shape(1)
      val oy = c.origin(0); val ox = c.origin(1)
      val n = h * w
      // dense local union-find: parent(i) over local linear indices,
      // -1 = background; min-root union keeps roots canonical
      val parent = new Array[Int](n)
      var i = 0
      while (i < n) { parent(i) = if (vals(i) >= threshold) i else -1; i += 1 }
      def find(x0: Int): Int = {
        var r = x0
        while (parent(r) != r) r = parent(r)
        var ccur = x0
        while (parent(ccur) != r) { val nx = parent(ccur); parent(ccur) = r; ccur = nx }
        r
      }
      def union(a: Int, b: Int): Unit = {
        val ra = find(a); val rb = find(b)
        if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
      }
      i = 0
      while (i < n) {
        if (parent(i) >= 0) {
          val yy = i / w; val xx = i % w
          if (xx + 1 < w && parent(i + 1) >= 0) union(i, i + 1)
          if (yy + 1 < h && parent(i + w) >= 0) union(i, i + w)
        }
        i += 1
      }
      // per-root partials keyed by the fragment's GLOBAL min voxel id
      val stats = new java.util.HashMap[Int, Array[Long]]()
      i = 0
      while (i < n) {
        if (parent(i) >= 0) {
          val r = find(i)
          val yy = oy + i / w; val xx = ox + i % w
          var s = stats.get(r)
          if (s == null) {
            s = Array(Long.MaxValue, 0L, Long.MaxValue, Long.MinValue,
              Long.MaxValue, Long.MinValue, 0L)
            stats.put(r, s)
          }
          val gid = yy * width + xx
          if (gid < s(0)) s(0) = gid
          s(1) += 1
          if (yy < s(2)) s(2) = yy
          if (yy > s(3)) s(3) = yy
          if (xx < s(4)) s(4) = xx
          if (xx > s(5)) s(5) = xx
          s(6) += vals(i).toLong
        }
        i += 1
      }
      val out = scala.collection.mutable.ArrayBuffer.empty[FragRow]
      val it = stats.values().iterator()
      while (it.hasNext) {
        val s = it.next()
        out += FragRow(0, s(0), 0L, 0L, s(1), s(2), s(3), s(4), s(5), s(6))
      }
      // boundary cells: foreground voxels on any chunk face, labeled
      // with their fragment id — O(perimeter) rows per chunk
      i = 0
      while (i < n) {
        if (parent(i) >= 0) {
          val ly = i / w; val lx = i % w
          if (ly == 0 || ly == h - 1 || lx == 0 || lx == w - 1) {
            val r = find(i)
            out += FragRow(1, stats.get(r)(0), oy + ly, ox + lx, 0, 0, 0, 0, 0, 0)
          }
        }
        i += 1
      }
      out
    }.toDF()
      // both splits below re-read this; fragment+boundary rows are
      // surface-proportional, so the persist is small by construction
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val partials = frags.filter(col("kind") === 0)
      .select(col("plabel"), col("size"), col("ymin"), col("ymax"),
        col("xmin"), col("xmax"), col("vsum"))
    val cells = frags.filter(col("kind") === 1)
      .select(col("plabel"), col("y"), col("x"))

    // cross-chunk (and redundant within-chunk) adjacency on boundary
    // cells: two equi-joins on shifted coordinates
    val right = cells.as("a").join(cells.as("b"),
      col("a.y") === col("b.y") && col("a.x") + 1 === col("b.x"))
      .select(col("a.plabel").as("doc_a"), col("b.plabel").as("doc_b"))
    val down = cells.as("a").join(cells.as("b"),
      col("a.y") + 1 === col("b.y") && col("a.x") === col("b.x"))
      .select(col("a.plabel").as("doc_a"), col("b.plabel").as("doc_b"))
    val edges = right.union(down).filter(col("doc_a") =!= col("doc_b"))

    val verts = partials.select(col("plabel").as("doc_id")).distinct()
    // (plabel, cluster_id); roots follow the min-label convention, and
    // the re-aggregation below takes min() anyway so the gate never
    // depends on that convention
    val labels = graft.ops.TextDedup.connectedComponents(edges, verts)

    val out = partials
      .join(labels.select(col("doc_id").as("plabel"), col("cluster_id")), Seq("plabel"))
      .groupBy(col("cluster_id"))
      .agg(min(col("plabel")).as("comp"), sum(col("size")).as("size"),
        min(col("ymin")).as("ymin"), max(col("ymax")).as("ymax"),
        min(col("xmin")).as("xmin"), max(col("xmax")).as("xmax"),
        sum(col("vsum")).as("vsum"))
      .select(col("comp"), col("size"), col("ymin"), col("ymax"),
        col("xmin"), col("xmax"), col("vsum"))
      .localCheckpoint(eager = true)
    frags.unpersist()
    out
  }

  /** Per-voxel component labels (y, x, comp) — the relabeled mask as
    * a relational view. Scale note: THIS one does explode voxels (its
    * output is voxel-sized by definition); the component resolution it
    * joins against is fragment-sized. Used by the gate on a row band
    * to pin per-voxel assignment, not just aggregate stats.
    */
  def componentLabels2d(spark: SparkSession, ds: Dataset[ChunkOps.ChunkRow],
      meta: ImageMeta, threshold: Double): DataFrame = {
    import spark.implicits._
    require(meta.dims == Seq("y", "x"),
      s"componentLabels2d expects a 2D (y, x) image, got ${meta.dims}")
    val width = meta.shape(1)
    val dtype = meta.dtype

    // same local pass, but emitting (gid, plabel) per foreground voxel
    val voxelFrag = ds.flatMap { c =>
      val vals = ZarrStore.decodeToDoubles(c.data, dtype)
      val h = c.shape(0); val w = c.shape(1)
      val oy = c.origin(0); val ox = c.origin(1)
      val n = h * w
      val parent = new Array[Int](n)
      var i = 0
      while (i < n) { parent(i) = if (vals(i) >= threshold) i else -1; i += 1 }
      def find(x0: Int): Int = {
        var r = x0
        while (parent(r) != r) r = parent(r)
        var ccur = x0
        while (parent(ccur) != r) { val nx = parent(ccur); parent(ccur) = r; ccur = nx }
        r
      }
      def union(a: Int, b: Int): Unit = {
        val ra = find(a); val rb = find(b)
        if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
      }
      i = 0
      while (i < n) {
        if (parent(i) >= 0) {
          val yy = i / w; val xx = i % w
          if (xx + 1 < w && parent(i + 1) >= 0) union(i, i + 1)
          if (yy + 1 < h && parent(i + w) >= 0) union(i, i + w)
        }
        i += 1
      }
      val minGid = new java.util.HashMap[Int, Long]()
      i = 0
      while (i < n) {
        if (parent(i) >= 0) {
          val r = find(i)
          val gid = (oy + i / w) * width + (ox + i % w)
          if (!minGid.containsKey(r) || gid < minGid.get(r)) minGid.put(r, gid)
        }
        i += 1
      }
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long)]
      i = 0
      while (i < n) {
        if (parent(i) >= 0) {
          val yy = oy + i / w; val xx = ox + i % w
          out += ((yy, xx, yy * width + xx, minGid.get(find(i)).longValue()))
        }
        i += 1
      }
      out
    }.toDF("y", "x", "gid", "plabel")

    // fragment → component resolution: boundary cells come straight
    // off the voxel view (face predicate on global coords), the
    // fragment graph is fragment-count-sized, and the resolved map
    // broadcasts — voxels join map-side, never shuffle
    val cells = voxelFrag.filter(
      (col("y") % meta.chunks(0) === 0) || (col("y") % meta.chunks(0) === meta.chunks(0) - 1) ||
      (col("x") % meta.chunks(1) === 0) || (col("x") % meta.chunks(1) === meta.chunks(1) - 1) ||
      (col("y") === meta.shape(0) - 1) || (col("x") === meta.shape(1) - 1))
      .select(col("plabel"), col("y"), col("x"))
    val right = cells.as("a").join(cells.as("b"),
      col("a.y") === col("b.y") && col("a.x") + 1 === col("b.x"))
      .select(col("a.plabel").as("doc_a"), col("b.plabel").as("doc_b"))
    val down = cells.as("a").join(cells.as("b"),
      col("a.y") + 1 === col("b.y") && col("a.x") === col("b.x"))
      .select(col("a.plabel").as("doc_a"), col("b.plabel").as("doc_b"))
    val edges = right.union(down).filter(col("doc_a") =!= col("doc_b"))
    // vertex domain: boundary fragments only — interior fragments never
    // merge across chunks, so the left join below coalesces them to
    // themselves without a voxel-sized distinct()
    val verts = cells.select(col("plabel").as("doc_id")).distinct()
    val labels = graft.ops.TextDedup.connectedComponents(edges, verts)
    val resolve = labels.groupBy(col("cluster_id"))
      .agg(min(col("doc_id")).as("comp"))
      .join(labels, Seq("cluster_id"))
      .select(col("doc_id").as("plabel"), col("comp"))
    voxelFrag.join(broadcast(resolve), Seq("plabel"), "left")
      .select(col("y"), col("x"), coalesce(col("comp"), col("plabel")).as("comp"))
  }
}
