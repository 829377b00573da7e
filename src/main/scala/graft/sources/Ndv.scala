package graft.sources

/** Per-file, per-column DISTINCT-COUNT sketches for the manifest —
  * the metadata that lets a 100 TB catalog table feed Catalyst's
  * cost-based optimizer (join reorder, equality selectivity = 1/ndv)
  * without an `ANALYZE TABLE` scan: every writer folds a tiny sketch
  * as it streams rows, the manifest line carries it (statsJson 4th
  * element), and plan time merges the per-file sketches of the
  * post-pruning file set — O(files × 64 B), driver-side, zero data
  * reads.
  *
  * Hybrid sparse/dense, the shape every production sketch uses
  * (Iceberg's theta, HLL++'s sparse mode):
  *
  *  - SPARSE: up to [[SparseCap]] distinct 64-bit value hashes kept
  *    exactly (sorted for deterministic encoding). Merging sparse
  *    sketches is set union — so for low-cardinality columns
  *    (statuses, priorities, flags: exactly the columns CBO's
  *    selectivity math cares most about) the merged table-level NDV
  *    is EXACT, and the `.stats` metadata table can be oracle-gated
  *    against `count(DISTINCT …)`.
  *  - DENSE: past the cap, a 64-register HLL (one byte per register;
  *    ~13% standard error — plenty for the order-of-magnitude
  *    decisions join reorder makes). Registers merge by max, the
  *    standard HLL union.
  *
  * Encoding is `s:`/`d:` + base64 — ~24-90 chars sparse, 88 chars
  * dense, per column per file line. At the 128 MB–1 GB file
  * discipline (SCALE.md) that is ≤ ~1 KB of extra metadata per file
  * entry, amortized by the segment envelope like every other stat.
  */
private[graft] object Ndv {
  val SparseCap = 16
  val Registers = 64 // 2^6

  /** splitmix64 finalizer — the public-domain 64-bit mixer; input
    * hashes (raw longs, double bits, string FNVs) pass through it so
    * register indexing sees uniform bits.
    */
  def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def addToDense(regs: Array[Byte], h: Long): Unit = {
    val idx = (h >>> 58).toInt // top 6 bits
    val w = h << 6
    val rank = (if (w == 0L) 59 else java.lang.Long.numberOfLeadingZeros(w) + 1)
    if (rank > regs(idx)) regs(idx) = rank.toByte
  }

  /** Standard HLL estimate over 64 registers (alpha for m = 64 with
    * linear counting in the small range) — public formula, Flajolet
    * et al. 2007.
    */
  def estimateDense(regs: Array[Byte]): Long = {
    val m = Registers
    var sum = 0.0
    var zeros = 0
    var i = 0
    while (i < m) {
      sum += java.lang.Math.pow(2.0, -regs(i).toDouble)
      if (regs(i) == 0) zeros += 1
      i += 1
    }
    val alpha = 0.709 // alpha_64
    val e = alpha * m * m / sum
    val est =
      if (e <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros)
      else e
    math.max(1L, math.round(est))
  }

  def encodeSparse(hashes: java.util.TreeSet[java.lang.Long]): String = {
    val bb = java.nio.ByteBuffer.allocate(hashes.size * 8)
    hashes.forEach(h => { bb.putLong(h); () })
    "s:" + java.util.Base64.getEncoder.encodeToString(bb.array())
  }

  def encodeDense(regs: Array[Byte]): String =
    "d:" + java.util.Base64.getEncoder.encodeToString(regs)

  /** Decoded sketch: Left = sparse hash set, Right = dense registers;
    * None for an unparseable/foreign string (treated as no sketch).
    */
  def decode(s: String): Option[Either[Array[Long], Array[Byte]]] =
    try {
      if (s.startsWith("s:")) {
        val b = java.util.Base64.getDecoder.decode(s.drop(2))
        val out = new Array[Long](b.length / 8)
        val bb = java.nio.ByteBuffer.wrap(b)
        var i = 0
        while (i < out.length) { out(i) = bb.getLong(); i += 1 }
        Some(Left(out))
      } else if (s.startsWith("d:")) {
        val b = java.util.Base64.getDecoder.decode(s.drop(2))
        if (b.length == Registers) Some(Right(b)) else None
      } else None
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Merge many per-file sketches into (estimate, exact?): exact when
    * every input is sparse and the union stays within [[SparseCap]]
    * (set union of exact hashes); an estimate otherwise. None when
    * any input is missing/unparseable — a table-level NDV from a
    * partial file set would be a lie.
    */
  def mergeEstimate(encoded: Seq[String]): Option[(Long, Boolean)] = {
    if (encoded.isEmpty || encoded.exists(_.isEmpty)) return None
    val decoded = encoded.map(decode)
    if (decoded.exists(_.isEmpty)) return None
    val parts = decoded.flatten
    val union = new java.util.TreeSet[java.lang.Long]()
    var dense: Array[Byte] = null
    def densify(): Unit = {
      if (dense == null) dense = new Array[Byte](Registers)
      union.forEach(h => addToDense(dense, h))
      union.clear()
    }
    parts.foreach {
      case Left(hashes) =>
        if (dense != null) hashes.foreach(addToDense(dense, _))
        else {
          hashes.foreach(h => { union.add(h); () })
          if (union.size > SparseCap) densify()
        }
      case Right(regs) =>
        densify()
        var i = 0
        while (i < Registers) {
          if (regs(i) > dense(i)) dense(i) = regs(i); i += 1
        }
    }
    if (dense == null) Some((union.size.toLong, true))
    else Some((estimateDense(dense), false))
  }

  /** Merge many sketches into one re-encodable sketch (compaction's
    * merged entry, a segment ref's union stats): None when any input
    * is missing — the merged entry then omits the field (unknown,
    * never guessed), same rule as bounds.
    */
  def mergeEncoded(encoded: Seq[String]): Option[String] = {
    if (encoded.isEmpty || encoded.exists(_.isEmpty)) return None
    val decoded = encoded.map(decode)
    if (decoded.exists(_.isEmpty)) return None
    val union = new java.util.TreeSet[java.lang.Long]()
    var dense: Array[Byte] = null
    def densify(): Unit = {
      if (dense == null) dense = new Array[Byte](Registers)
      union.forEach(h => addToDense(dense, h))
      union.clear()
    }
    decoded.flatten.foreach {
      case Left(hashes) =>
        if (dense != null) hashes.foreach(addToDense(dense, _))
        else {
          hashes.foreach(h => { union.add(h); () })
          if (union.size > SparseCap) densify()
        }
      case Right(regs) =>
        densify()
        var i = 0
        while (i < Registers) {
          if (regs(i) > dense(i)) dense(i) = regs(i); i += 1
        }
    }
    Some(if (dense == null) encodeSparse(union) else encodeDense(dense))
  }
}

/** One column's accumulating sketch inside a writer task: exact
  * sorted hash set up to the cap, then dense registers. Zero
  * allocation per row past the sparse phase.
  */
private[graft] final class NdvSketch {
  private val sparse = new java.util.TreeSet[java.lang.Long]()
  private var dense: Array[Byte] = null

  def add(h: Long): Unit = {
    if (dense != null) Ndv.addToDense(dense, h)
    else {
      sparse.add(h)
      if (sparse.size > Ndv.SparseCap) {
        dense = new Array[Byte](Ndv.Registers)
        sparse.forEach(x => Ndv.addToDense(dense, x))
        sparse.clear()
      }
    }
  }

  def isEmpty: Boolean = dense == null && sparse.isEmpty

  def encode: String =
    if (dense != null) Ndv.encodeDense(dense) else Ndv.encodeSparse(sparse)
}
