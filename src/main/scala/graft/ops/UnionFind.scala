package graft.ops

/** Minimal open-addressing Long→Long hash map (linear probing,
  * power-of-two capacity, 0.75 load factor) — primitive-specialized so
  * the union-find paths can hold millions of entries without the
  * boxing overhead (and heap blow-up) of `mutable.HashMap[Long, Long]`.
  * An `occupied` byte per slot avoids reserving any key value.
  */
private[ops] final class LongLongMap(initialCapacity: Int = 1 << 16) {
  private var mask = 0
  private var keys: Array[Long] = _
  private var vals: Array[Long] = _
  private var used: Array[Boolean] = _
  private var n = 0
  allocate(math.max(16, Integer.highestOneBit(initialCapacity - 1) << 1))

  private def allocate(cap: Int): Unit = {
    keys = new Array[Long](cap)
    vals = new Array[Long](cap)
    used = new Array[Boolean](cap)
    mask = cap - 1
    n = 0
  }

  private def slot(k: Long): Int = {
    // Fibonacci-style mix spreads sequential ids across the table
    var i = (java.lang.Long.hashCode(k * -7046029254386353131L)) & mask
    while (used(i) && keys(i) != k) i = (i + 1) & mask
    i
  }

  def size: Int = n

  def contains(k: Long): Boolean = used(slot(k))

  def getOrDefault(k: Long, default: Long): Long = {
    val i = slot(k)
    if (used(i)) vals(i) else default
  }

  def put(k: Long, v: Long): Unit = {
    val i = slot(k)
    if (used(i)) vals(i) = v
    else {
      if ((n + 1).toLong * 4 > (mask + 1).toLong * 3) { grow(); put(k, v) }
      else { used(i) = true; keys(i) = k; vals(i) = v; n += 1 }
    }
  }

  private def grow(): Unit = {
    val ok = keys; val ov = vals; val ou = used
    allocate((mask + 1) << 1)
    var i = 0
    while (i < ok.length) {
      if (ou(i)) put(ok(i), ov(i))
      i += 1
    }
  }

  /** Iterate entries. Safe under concurrent `put` of EXISTING keys
    * (value updates never move or add slots); inserting during
    * iteration is not.
    */
  def iterator: Iterator[(Long, Long)] = new Iterator[(Long, Long)] {
    private var i = 0
    private def advance(): Unit = { while (i < used.length && !used(i)) i += 1 }
    advance()
    def hasNext: Boolean = i < used.length
    def next(): (Long, Long) = { val r = (keys(i), vals(i)); i += 1; advance(); r }
  }
}

/** Union-find over long ids with path compression and min-root union
  * (every root is its component's minimum id), backed by
  * [[LongLongMap]]. ~17 bytes/vertex at 0.75 load — 10M vertices fit
  * in ~230 MB, an order of magnitude below the boxed-HashMap form.
  */
private[ops] final class LongUnionFind {
  private val parent = new LongLongMap(1 << 16)

  def find(x: Long): Long = {
    var r = x
    while (parent.getOrDefault(r, r) != r) r = parent.getOrDefault(r, r)
    var c = x
    while (parent.getOrDefault(c, c) != r) {
      val nxt = parent.getOrDefault(c, c)
      parent.put(c, r)
      c = nxt
    }
    r
  }

  def union(u: Long, v: Long): Unit = {
    if (!parent.contains(u)) parent.put(u, u)
    if (!parent.contains(v)) parent.put(v, v)
    val ru = find(u)
    val rv = find(v)
    if (ru != rv) { if (ru < rv) parent.put(rv, ru) else parent.put(ru, rv) }
  }

  /** (vertex, component-min) for every vertex ever passed to
    * [[union]]. find() during iteration only rewrites existing
    * entries (path compression), which [[LongLongMap.iterator]]
    * tolerates.
    */
  def labels: Iterator[(Long, Long)] = parent.iterator.map { case (k, _) => (k, find(k)) }
}
