package graft.expressions

import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.unsafe.types.UTF8String

/** Scalar kernels behind the custom Catalyst expressions. Top-level
  * objects without companion classes compile with static forwarders, so
  * generated (janino) code calls these directly — the expressions stay
  * inside whole-stage codegen instead of falling back to interpreted
  * eval.
  *
  * All hashing is FNV-1a 64-bit (public-domain constants) — chosen over
  * JVM `hashCode` for a stable cross-platform 64-bit contract.
  */
object Kernels {
  final val FnvOffset = 0xcbf29ce484222325L
  final val FnvPrime = 0x100000001b3L

  /** FNV-1a 64 over the UTF-8 bytes of `s`. */
  def fnv1a64(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = FnvOffset
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= FnvPrime
      i += 1
    }
    h
  }

  /** Unicode NFC normalization (composed form). Fast path: NFC-quick
    * check via `Normalizer.isNormalized` returns the INPUT object for
    * the overwhelmingly common already-composed case — zero
    * allocation, one pass; only genuinely decomposed strings pay the
    * recomposition.
    */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str,
        java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(java.text.Normalizer.normalize(str,
      java.text.Normalizer.Form.NFC))
  }

  /** FNV-1a 64 of an 8-byte little-endian long (used to derive
    * independent hash families / hyperplanes from a seed).
    */
  def fnv1a64Long(v: Long): Long = {
    var h = FnvOffset
    var i = 0
    while (i < 8) {
      h ^= ((v >>> (8 * i)) & 0xffL)
      h *= FnvPrime
      i += 1
    }
    h
  }

  /** 64-bit SimHash over whitespace tokens of the lowercased input.
    * Spec: tokens = `lower(s)` split on runs of whitespace; each token
    * hashed with fnv1a64; bit b of the result is 1 iff the count of
    * tokens with bit b set exceeds half the token count (majority vote,
    * ties → 0). Token multiplicity counts (a repeated token votes
    * repeatedly). Empty/blank input → 0L.
    */
  def simhash64(s: UTF8String): Long = {
    val text = s.toLowerCase.toString
    val counts = new Array[Int](64)
    var nTokens = 0
    var start = 0
    val n = text.length
    var i = 0
    while (i <= n) {
      if (i == n || Character.isWhitespace(text.charAt(i))) {
        if (i > start) {
          val h = fnv1a64(UTF8String.fromString(text.substring(start, i)))
          nTokens += 1
          var b = 0
          while (b < 64) {
            if (((h >>> b) & 1L) == 1L) counts(b) += 1
            b += 1
          }
        }
        start = i + 1
      }
      i += 1
    }
    if (nTokens == 0) return 0L
    var out = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) * 2 > nTokens) out |= (1L << b)
      b += 1
    }
    out
  }

  def hamming64(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  /** Distinct word n-grams of the lowercased input, one pass, no nested
    * higher-order functions: tokens = runs of non-whitespace (Java
    * regex `\s` set, matching `split(lower(trim(s)), "\\s+")` with
    * empties removed); result = first-occurrence-distinct n-grams
    * joined by a single space. Fewer than n tokens → empty array.
    * n = 1 degenerates to the distinct token set.
    *
    * Exists because the `transform(sequence, slice, array_join)`
    * composition evaluates interpreted per element and re-tokenizes
    * per slice — O(len²) per row vs this kernel's O(len), and this one
    * stays inside whole-stage codegen.
    */
  def wordNGrams(s: UTF8String, n: Int): ArrayData = {
    val text = s.toLowerCase.toString
    val toks = new java.util.ArrayList[String]()
    var start = -1
    var i = 0
    val len = text.length
    while (i <= len) {
      val ws = i == len || (text.charAt(i) match {
        case ' ' | '\t' | '\n' | '\u000B' | '\f' | '\r' => true
        case _ => false
      })
      if (ws) {
        if (start >= 0) { toks.add(text.substring(start, i)); start = -1 }
      } else if (start < 0) start = i
      i += 1
    }
    val m = toks.size - n + 1
    if (m <= 0)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String]()
    var j = 0
    while (j < m) {
      if (n == 1) seen.add(toks.get(j))
      else {
        val sb = new java.lang.StringBuilder()
        var k = 0
        while (k < n) {
          if (k > 0) sb.append(' ')
          sb.append(toks.get(j + k))
          k += 1
        }
        seen.add(sb.toString)
      }
      j += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var o = 0
    while (it.hasNext) { out(o) = UTF8String.fromString(it.next()); o += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Cosine similarity of two float vectors, accumulated in double,
    * sequential order (matches a plain loop; 0.0 when either norm is 0).
    */
  def cosineF(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = if (a.isNullAt(i)) 0.0 else a.getFloat(i).toDouble
      val y = if (b.isNullAt(i)) 0.0 else b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  def dotF(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0
    var i = 0
    while (i < n) {
      val x = if (a.isNullAt(i)) 0.0 else a.getFloat(i).toDouble
      val y = if (b.isNullAt(i)) 0.0 else b.getFloat(i).toDouble
      dot += x * y; i += 1
    }
    dot
  }

  /** Hyperplane sign matrices for [[srpBucket]], memoized per
    * (seed, numBits, dim). The signs depend only on those three values,
    * so deriving them per row would cost numBits × dim fnv1a64Long
    * evaluations per row; here each JVM derives them once and the per-row
    * work is a pure multiply-add sweep. Flattened layout: entry
    * (p, d) at index p*dim + d, value +1.0 / -1.0. The map is tiny in
    * practice (one entry per distinct LSH configuration per executor);
    * bounded defensively so a pathological caller can't leak memory.
    */
  private val srpSignCache =
    new java.util.concurrent.ConcurrentHashMap[(Long, Int, Int), Array[Double]]()
  private final val SrpCacheMax = 64

  private def srpSigns(seed: Long, numBits: Int, dim: Int): Array[Double] = {
    val key = (seed, numBits, dim)
    val cached = srpSignCache.get(key)
    if (cached != null) return cached
    val signs = new Array[Double](numBits * dim)
    var p = 0
    while (p < numBits) {
      var d = 0
      while (d < dim) {
        // Bit-identical to the original per-row derivation: the sign of
        // hyperplane p in dimension d is the low bit of
        // fnv1a64Long(seed * phi + p*131071 + d).
        val bit = fnv1a64Long(seed * 0x9e3779b97f4a7c15L + p.toLong * 131071L + d) & 1L
        signs(p * dim + d) = if (bit == 1L) 1.0 else -1.0
        d += 1
      }
      p += 1
    }
    if (srpSignCache.size < SrpCacheMax) srpSignCache.putIfAbsent(key, signs)
    signs
  }

  /** Signed-random-projection LSH bucket: bit p of the result is the
    * sign of `v · h_p`, where hyperplane `h_p(d) ∈ {+1,-1}` is derived
    * deterministically from (seed, p, d) via fnv1a64Long — no RNG state,
    * reproducible across executors/runs. numBits ≤ 63. The hyperplane
    * sign matrix is precomputed once per (seed, numBits, dim) (see
    * [[srpSigns]]); the per-row cost is numBits × dim multiply-adds.
    */
  def srpBucket(v: ArrayData, numBits: Int, seed: Long): Long = {
    val dim = v.numElements()
    val signs = srpSigns(seed, numBits, dim)
    var bucket = 0L
    var p = 0
    while (p < numBits) {
      var proj = 0.0
      val base = p * dim
      var d = 0
      while (d < dim) {
        if (!v.isNullAt(d)) proj += v.getFloat(d).toDouble * signs(base + d)
        d += 1
      }
      if (proj >= 0.0) bucket |= (1L << p)
      p += 1
    }
    bucket
  }

  /** Multi-probe SRP (Lv et al., VLDB 2007, applied to sign-random
    * projections): the base bucket of [[srpBucket]] plus the
    * `nProbes - 1` neighbouring buckets most likely to hold a true
    * neighbour — the ones reached by flipping the bits whose projection
    * sits closest to the hyperplane. Perturbation sets (single bits and
    * bit pairs) are ranked by total |margin|; a vector a hair's width
    * from hyperplanes p and q probes p-flipped, q-flipped, then
    * pq-flipped before any confidently-signed bit moves. QUERY-side
    * only: the corpus keeps one bucket per table, so index size and the
    * shuffle are unchanged — recall is bought with nProbes× more
    * (tiny) query-side rows instead of tables× more corpus copies.
    * Element 0 is always the base bucket (probes(v, b, s, 1) ≡
    * [srpBucket(v, b, s)]); elements are distinct.
    */
  def srpProbes(v: ArrayData, numBits: Int, seed: Long,
      nProbes: Int): ArrayData = {
    val dim = v.numElements()
    val signs = srpSigns(seed, numBits, dim)
    val proj = new Array[Double](numBits)
    var base = 0L
    var p = 0
    while (p < numBits) {
      var s = 0.0
      val off = p * dim
      var d = 0
      while (d < dim) {
        if (!v.isNullAt(d)) s += v.getFloat(d).toDouble * signs(off + d)
        d += 1
      }
      proj(p) = math.abs(s)
      if (s >= 0.0) base |= (1L << p)
      p += 1
    }
    val want = math.min(nProbes, 1 + numBits + numBits * (numBits - 1) / 2)
    val out = new Array[Long](want)
    out(0) = base
    if (want > 1) {
      // candidate flips: all single bits, all bit pairs — numBits ≤ 63
      // keeps this a few thousand entries at most, built per row only
      // on the (small) query side
      val cand = Array.newBuilder[(Double, Long)]
      var i = 0
      while (i < numBits) {
        cand += ((proj(i), 1L << i))
        var j = i + 1
        while (j < numBits) {
          cand += ((proj(i) + proj(j), (1L << i) | (1L << j)))
          j += 1
        }
        i += 1
      }
      val ranked = cand.result().sortBy(_._1)
      var o = 1
      while (o < want) {
        out(o) = base ^ ranked(o - 1)._2
        o += 1
      }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Rabin-Karp base for the rolling char-gram hashes behind
    * [[winnowFingerprints]] / [[charGramHashes]] (prime, public-domain
    * constant; 64-bit wrapping arithmetic IS the modulus).
    */
  final val RkBase = 1000003L

  /** Winnowing normalization (Schleimer/Wilkerson/Aiken, SIGMOD 2003 —
    * the MOSS scheme): lowercase, keep only letter/digit chars, drop
    * everything else — so whitespace/punctuation edits never move a
    * fingerprint. Char-level (UTF-16 units): surrogate halves pass
    * through individually, which is deterministic and
    * self-consistent — both sides of a match normalize identically.
    */
  private def normalizeChars(s: UTF8String): Array[Char] = {
    val text = s.toLowerCase.toString
    val out = new Array[Char](text.length)
    var n = 0
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      if (Character.isLetterOrDigit(c)) { out(n) = c; n += 1 }
      i += 1
    }
    if (n == out.length) out else java.util.Arrays.copyOf(out, n)
  }

  /** All k-gram polynomial hashes of `cs` in positional order:
    * h(i) = sum_{j<k} cs(i+j) · RkBase^(k-1-j) (wrapping). Computed by
    * the O(len) rolling recurrence
    * h(i+1) = (h(i) − cs(i)·RkBase^(k-1))·RkBase + cs(i+k) — the whole
    * point of the scheme: one multiply-add per position, not one per
    * (position, offset) pair.
    */
  private def gramHashes(cs: Array[Char], k: Int): Array[Long] = {
    val m = cs.length - k + 1
    if (m <= 0) return Array.emptyLongArray
    val hs = new Array[Long](m)
    var pow = 1L
    var i = 1
    while (i < k) { pow *= RkBase; i += 1 }
    var h = 0L
    i = 0
    while (i < k) { h = h * RkBase + cs(i); i += 1 }
    hs(0) = h
    i = 1
    while (i < m) {
      h = (h - cs(i - 1) * pow) * RkBase + cs(i + k - 1)
      hs(i) = h
      i += 1
    }
    hs
  }

  private def distinctSorted(hs: java.util.TreeSet[java.lang.Long]): ArrayData = {
    val out = new Array[Any](hs.size)
    val it = hs.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next().longValue(); i += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Distinct k-gram hashes of the normalized text, ascending (signed
    * order) — the exact char-gram set for containment rescoring beside
    * the winnowed selection. Fewer than k normalized chars → empty.
    */
  def charGramHashes(s: UTF8String, k: Int): ArrayData = {
    val hs = gramHashes(normalizeChars(s), k)
    val set = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < hs.length) { set.add(hs(i)); i += 1 }
    distinctSorted(set)
  }

  /** Winnowing fingerprints (Schleimer et al. 2003): from each window
    * of `w` consecutive k-gram hashes select the minimum — signed
    * 64-bit order, ties broken by the RIGHTMOST position (the `<=`
    * takeover below makes every window's selection exactly its
    * rightmost minimal hash; DedupSpec pins this against a direct
    * per-window reference). Guarantee: any shared normalized substring of
    * length ≥ w + k − 1 between two documents yields at least one
    * shared fingerprint. Result: distinct selected hashes, ascending.
    * Fewer grams than one window → the global minimum alone (short
    * docs still fingerprint). Fewer than k normalized chars → empty.
    */
  def winnowFingerprints(s: UTF8String, k: Int, w: Int): ArrayData = {
    val hs = gramHashes(normalizeChars(s), k)
    val sel = new java.util.TreeSet[java.lang.Long]()
    if (hs.length > 0 && hs.length <= w) {
      var minIdx = 0
      var j = 1
      while (j < hs.length) { if (hs(j) <= hs(minIdx)) minIdx = j; j += 1 }
      sel.add(hs(minIdx))
    } else if (hs.length > w) {
      var minIdx = -1
      var end = w - 1
      while (end < hs.length) {
        val from = end - w + 1
        if (minIdx < from) {
          minIdx = from
          var j = from + 1
          while (j <= end) { if (hs(j) <= hs(minIdx)) minIdx = j; j += 1 }
          sel.add(hs(minIdx))
        } else if (hs(end) <= hs(minIdx)) {
          minIdx = end
          sel.add(hs(end))
        }
        end += 1
      }
    }
    distinctSorted(sel)
  }

  /** MinHash signature vector over a string array (the distinct
    * shingles of one document): sig(t) = min over grams g of
    * fnv1a64Long(fnv1a64(g) ^ mix(t)), one independent hash family per
    * table derived from (seed, t) — no RNG state, reproducible across
    * executors. Each gram is hashed ONCE; per-table mixing is a single
    * 8-byte re-hash, so a row costs |grams| string hashes + |grams|×T
    * long hashes. Empty input → all Long.MaxValue (a sentinel real
    * signatures can't reach, so empty docs never collide into a band).
    */
  def minHashSigs(v: ArrayData, numTables: Int, seed: Long): ArrayData = {
    val sigs = Array.fill(numTables)(Long.MaxValue)
    val n = v.numElements()
    var i = 0
    while (i < n) {
      // null elements (possible via the SQL surface) are skipped, as
      // if absent from the set
      if (!v.isNullAt(i)) {
        val h = fnv1a64(v.getUTF8String(i))
        var t = 0
        while (t < numTables) {
          val m = fnv1a64Long(h ^ (seed + t.toLong * 0x9e3779b97f4a7c15L))
          if (m < sigs(t)) sigs(t) = m
          t += 1
        }
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      sigs.map(x => x: Any))
  }

  /** Rank bucket of `v` against ascending cut points: the count of
    * bounds ≤ v (binary search), so the result spans [0, bounds.length]
    * and quantile cut points yield ~equal-count buckets regardless of
    * value skew. The Z-order clustering primitive
    * ([[graft.operators.ZOrder]]).
    */
  def rangeBucket(v: Double, bounds: Array[Double]): Int = {
    var lo = 0
    var hi = bounds.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (bounds(mid) <= v) lo = mid + 1 else hi = mid
    }
    lo
  }

  /** Symmetric int8 scalar quantization of a float vector: code(i) =
    * round(x_i * 127 / maxAbs(x)), so codes span [-127, 127] and the
    * all-zero vector stays all-zero. Returns the dim-byte code array —
    * 4× smaller than float32, the memory/IO trade that lets a 100 TB
    * embedding corpus fit a quarter of the executors (the scale story
    * of every SQ8 ANN index).
    */
  def sq8Quantize(v: ArrayData): Array[Byte] = {
    val n = v.numElements()
    val out = new Array[Byte](n)
    // null elements (possible via the SQL surface) read as 0f
    def at(i: Int): Float = if (v.isNullAt(i)) 0f else v.getFloat(i)
    var maxAbs = 0f
    var i = 0
    while (i < n) {
      val a = math.abs(at(i))
      if (a > maxAbs) maxAbs = a
      i += 1
    }
    if (maxAbs == 0f) return out
    val s = 127f / maxAbs
    i = 0
    while (i < n) {
      out(i) = math.round(at(i) * s).max(-127).min(127).toByte
      i += 1
    }
    out
  }

  // ----- Product quantization (PQ / ADC; Jégou et al., TPAMI 2011) -----

  /** L2-normalized copy of a float array column value (nulls read as
    * 0f; the all-zero vector stays all-zero). PQ here scores COSINE
    * neighbours, so both training and encoding live on the unit
    * sphere, where squared euclidean distance is monotone with cosine
    * (‖a−b‖² = 2 − 2·cos) — the same normalize-then-L2 contract the
    * IVF quantizer uses.
    */
  private def l2NormedFloats(v: ArrayData): Array[Float] = {
    val n = v.numElements()
    val out = new Array[Float](n)
    var ss = 0.0
    var i = 0
    while (i < n) {
      val x = if (v.isNullAt(i)) 0f else v.getFloat(i)
      out(i) = x
      ss += x.toDouble * x.toDouble
      i += 1
    }
    if (ss == 0.0) return out
    val inv = (1.0 / math.sqrt(ss)).toFloat
    i = 0
    while (i < n) { out(i) *= inv; i += 1 }
    out
  }

  /** Train PQ codebooks: split each (normalized) `dim`-float vector
    * into `m` contiguous subvectors of `dim/m` floats and run plain
    * Lloyd k-means with `k` centroids independently per subspace.
    * Returns the flat codebook array laid out
    * `((sub*k + centroid)*subDim + d)` — `m*k*(dim/m)` floats total,
    * kilobytes at any practical (m, k), so it broadcasts as a codegen
    * reference object exactly like [[rangeBucket]]'s cut points.
    *
    * Training is SAMPLE-based by construction (the standard PQ
    * contract: codebooks converge on 10⁴-10⁵ vectors no matter how
    * large the corpus), so callers hand this a bounded in-memory
    * sample, never the corpus. Deterministic under `seed`: centroid
    * init picks distinct sample rows; an emptied cluster reseeds to
    * the point farthest from its assigned centroid.
    */
  def pqTrain(samples: Array[Array[Float]], m: Int, k: Int,
      iters: Int, seed: Long): Array[Float] = {
    val n = samples.length
    require(n >= k, s"need at least k=$k sample vectors, got $n")
    val dim = samples(0).length
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val subDim = dim / m
    val cb = new Array[Float](m * k * subDim)
    val rnd = new java.util.Random(seed)
    // normalize once
    val normed = samples.map { s =>
      var ss = 0.0
      var i = 0
      while (i < s.length) { ss += s(i).toDouble * s(i).toDouble; i += 1 }
      if (ss == 0.0) s
      else { val inv = (1.0 / math.sqrt(ss)).toFloat; s.map(_ * inv) }
    }
    var sub = 0
    while (sub < m) {
      val base = sub * k * subDim
      val off = sub * subDim
      // init: k distinct sample rows (Fisher-Yates prefix)
      val idx = Array.tabulate(n)(identity)
      var i = 0
      while (i < k) {
        val j = i + rnd.nextInt(n - i)
        val t = idx(i); idx(i) = idx(j); idx(j) = t
        System.arraycopy(normed(idx(i)), off, cb, base + i * subDim, subDim)
        i += 1
      }
      val assign = new Array[Int](n)
      var it = 0
      while (it < iters) {
        // assignment
        var r = 0
        while (r < n) {
          val v = normed(r)
          var bestC = 0
          var bestD = Double.MaxValue
          var c = 0
          while (c < k) {
            var d = 0.0
            var j = 0
            while (j < subDim) {
              val diff = v(off + j) - cb(base + c * subDim + j)
              d += diff * diff
              j += 1
            }
            if (d < bestD) { bestD = d; bestC = c }
            c += 1
          }
          assign(r) = bestC
          r += 1
        }
        // update
        val sums = new Array[Double](k * subDim)
        val counts = new Array[Int](k)
        r = 0
        while (r < n) {
          val c = assign(r)
          counts(c) += 1
          var j = 0
          while (j < subDim) {
            sums(c * subDim + j) += normed(r)(off + j)
            j += 1
          }
          r += 1
        }
        var c = 0
        while (c < k) {
          if (counts(c) == 0) {
            // reseed the empty cluster to the sample point farthest
            // from its current centroid (deterministic split of the
            // widest cluster)
            var farR = 0
            var farD = -1.0
            r = 0
            while (r < n) {
              val cc = assign(r)
              var d = 0.0
              var j = 0
              while (j < subDim) {
                val diff = normed(r)(off + j) - cb(base + cc * subDim + j)
                d += diff * diff
                j += 1
              }
              if (d > farD) { farD = d; farR = r }
              r += 1
            }
            System.arraycopy(normed(farR), off, cb, base + c * subDim, subDim)
          } else {
            var j = 0
            while (j < subDim) {
              cb(base + c * subDim + j) =
                (sums(c * subDim + j) / counts(c)).toFloat
              j += 1
            }
          }
          c += 1
        }
        it += 1
      }
      sub += 1
    }
    cb
  }

  /** Driver-side spherical k-means with DETERMINISTIC k-means++
    * seeding (Arthur & Vassilvitskii, SODA 2007): D²-weighted center
    * selection via a seeded RNG walking the caller's hash-ordered
    * sample, then Lloyd iterations with deterministic empty-cluster
    * reseeding (ties break to the lowest row index everywhere).
    * Every step is a pure function of (samples-in-order, k, iters,
    * seed), so fits are bit-stable across JVMs, partition layouts,
    * and executor counts — determinism comes from the ALGORITHM, not
    * from pinning shuffle placement. (Round 8 pinned the placement
    * coin instead and the deterministic random draw landed a poor
    * codebook: the IVF family's recall fell 0.80 → 0.64. k-means++
    * removes the coin AND spreads the seeds, recovering the recall
    * while keeping the 3-run bit-stability the tightened tolerance
    * bounds rely on.)
    *
    * Samples are L2-normalized internally (spherical k-means — the
    * quantizer metric must match cosine scoring; see ivfFit's
    * l2normed note). Returns k·dim flat floats, row-major, the same
    * layout [[pqEncode]] consumes with m=1.
    */
  def kmeansFit(samples: Array[Array[Float]], k: Int, iters: Int,
      seed: Long): Array[Float] = {
    val n = samples.length
    require(n >= k, s"need at least k=$k sample vectors, got $n")
    val dim = samples(0).length
    val normed = samples.map { s =>
      var ss = 0.0
      var i = 0
      while (i < s.length) { ss += s(i).toDouble * s(i).toDouble; i += 1 }
      if (ss == 0.0) s
      else { val inv = (1.0 / math.sqrt(ss)).toFloat; s.map(_ * inv) }
    }
    val cb = new Array[Float](k * dim)
    val rnd = new java.util.Random(seed)
    // --- k-means++ seeding: first center uniform, each next center
    // D²-weighted by squared distance to the nearest chosen center.
    // d2 is updated incrementally (one pass per new center), and the
    // cumulative-weight walk visits rows in sample order — both fix
    // the float summation order, so seeding is bit-stable.
    val d2 = new Array[Double](n)
    java.util.Arrays.fill(d2, Double.MaxValue)
    var chosen = rnd.nextInt(n)
    System.arraycopy(normed(chosen), 0, cb, 0, dim)
    var c = 1
    while (c < k) {
      val prev = (c - 1) * dim
      var total = 0.0
      var r = 0
      while (r < n) {
        var d = 0.0
        var j = 0
        while (j < dim) {
          val diff = normed(r)(j).toDouble - cb(prev + j)
          d += diff * diff
          j += 1
        }
        if (d < d2(r)) d2(r) = d
        total += d2(r)
        r += 1
      }
      if (total <= 0.0) {
        // all residual mass zero (duplicate-heavy sample): fall back
        // to a deterministic stride so centers stay distinct rows
        chosen = (chosen + 1 + c) % n
      } else {
        val target = rnd.nextDouble() * total
        var cum = 0.0
        chosen = n - 1
        r = 0
        var found = false
        while (r < n && !found) {
          cum += d2(r)
          if (cum >= target) { chosen = r; found = true }
          r += 1
        }
      }
      System.arraycopy(normed(chosen), 0, cb, c * dim, dim)
      c += 1
    }
    // --- Lloyd iterations (same deterministic update/reseed
    // discipline as pqTrain's subspace loop)
    val assign = new Array[Int](n)
    var it = 0
    while (it < iters) {
      var r = 0
      while (r < n) {
        val v = normed(r)
        var bestC = 0
        var bestD = Double.MaxValue
        var cc = 0
        while (cc < k) {
          var d = 0.0
          var j = 0
          while (j < dim) {
            val diff = v(j) - cb(cc * dim + j)
            d += diff * diff
            j += 1
          }
          if (d < bestD) { bestD = d; bestC = cc }
          cc += 1
        }
        assign(r) = bestC
        r += 1
      }
      val sums = new Array[Double](k * dim)
      val counts = new Array[Int](k)
      r = 0
      while (r < n) {
        val cc = assign(r)
        counts(cc) += 1
        var j = 0
        while (j < dim) { sums(cc * dim + j) += normed(r)(j); j += 1 }
        r += 1
      }
      var cc = 0
      while (cc < k) {
        if (counts(cc) == 0) {
          var farR = 0
          var farD = -1.0
          r = 0
          while (r < n) {
            val a = assign(r)
            var d = 0.0
            var j = 0
            while (j < dim) {
              val diff = normed(r)(j) - cb(a * dim + j)
              d += diff * diff
              j += 1
            }
            if (d > farD) { farD = d; farR = r }
            r += 1
          }
          System.arraycopy(normed(farR), 0, cb, cc * dim, dim)
        } else {
          var j = 0
          while (j < dim) {
            cb(cc * dim + j) = (sums(cc * dim + j) / counts(cc)).toFloat
            j += 1
          }
        }
        cc += 1
      }
      it += 1
    }
    cb
  }

  /** Nearest-centroid cell id over the full (normalized) vector —
    * [[pqEncode]] with a single subspace, widened past byte range so
    * quantizers may have up to 256 cells. Ties break to the lowest
    * cell, matching the probe side's (d2 asc, cell asc) ordering.
    */
  def ivfCell(v: ArrayData, cb: Array[Float], k: Int): Int =
    pqEncode(v, cb, 1, k)(0) & 0xff

  /** PQ-encode a vector: per subspace, the index of the nearest
    * codebook centroid (squared L2 in normalized space; ties break to
    * the lowest index). Returns `m` bytes — with m=16 on a 64-dim
    * float32 embedding that is 16 bytes against 256 raw, the 16×
    * shrink that lets the ANN coarse pass stream a 100 TB corpus from
    * a ~6 TB code table. Requires k ≤ 256 (byte codes).
    */
  def pqEncode(v: ArrayData, cb: Array[Float], m: Int, k: Int): Array[Byte] = {
    val subDim = cb.length / (m * k)
    val x = l2NormedFloats(v)
    val out = new Array[Byte](m)
    var sub = 0
    while (sub < m) {
      val base = sub * k * subDim
      val off = sub * subDim
      var bestC = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < k) {
        var d = 0.0
        var j = 0
        while (j < subDim) {
          val xv = if (off + j < x.length) x(off + j) else 0f
          val diff = xv - cb(base + c * subDim + j)
          d += diff * diff
          j += 1
        }
        if (d < bestD) { bestD = d; bestC = c }
        c += 1
      }
      out(sub) = bestC.toByte
      sub += 1
    }
    out
  }

  /** Query-side ADC distance table: squared L2 from the (normalized)
    * query's subvector `sub` to codebook centroid `c`, flat at
    * `sub*k + c` — m·k floats computed ONCE per query, after which
    * every corpus code scores in m table lookups ([[pqAdc]]), never
    * touching float embeddings. This asymmetry (exact query vs
    * quantized corpus) is what ADC names, and it is the whole trick:
    * the corpus-side scan cost is decoupled from the embedding width.
    */
  def pqAdcTable(v: ArrayData, cb: Array[Float], m: Int,
      k: Int): Array[Float] = {
    val subDim = cb.length / (m * k)
    val x = l2NormedFloats(v)
    val out = new Array[Float](m * k)
    var sub = 0
    while (sub < m) {
      val base = sub * k * subDim
      val off = sub * subDim
      var c = 0
      while (c < k) {
        var d = 0.0
        var j = 0
        while (j < subDim) {
          val xv = if (off + j < x.length) x(off + j) else 0f
          val diff = xv - cb(base + c * subDim + j)
          d += diff * diff
          j += 1
        }
        out(sub * k + c) = d.toFloat
        c += 1
      }
      sub += 1
    }
    out
  }

  /** ADC score: Σ_sub table[sub*k + code(sub)] — the approximate
    * squared L2 between the query and a PQ-coded corpus vector in
    * normalized space (k inferred from the table/code lengths).
    * Smaller is nearer; `1 − d/2` converts back to approximate cosine.
    */
  def pqAdc(table: ArrayData, code: Array[Byte]): Double = {
    val m = code.length
    if (m == 0) return 0.0
    val k = table.numElements() / m
    var d = 0.0
    var sub = 0
    while (sub < m) {
      d += table.getFloat(sub * k + (code(sub) & 0xff))
      sub += 1
    }
    d
  }

  /** Cosine over two int8 code vectors: pure integer dot and norms
    * (the per-vector quantization scales cancel in the ratio). 0.0 when
    * either vector is all-zero; mismatched lengths use the shorter.
    */
  def sq8Cosine(a: Array[Byte], b: Array[Byte]): Double = {
    val n = math.min(a.length, b.length)
    var dot = 0L; var na = 0L; var nb = 0L
    var i = 0
    while (i < n) {
      val x = a(i).toLong; val y = b(i).toLong
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0L || nb == 0L) 0.0
    else dot / math.sqrt(na.toDouble * nb.toDouble)
  }

  /** Popcount of a bitmap byte array (the exact-distinct companion to
    * the HLL estimate — see `graft.functions.BitmapDistinct`).
    */
  def bitmapCardinality(b: Array[Byte]): Long = {
    var i = 0
    var n = 0L
    while (i < b.length) {
      n += java.lang.Integer.bitCount(b(i) & 0xFF)
      i += 1
    }
    n
  }

  /** |A ∩ B| of two bitmaps — popcount of the byte-wise AND (bytes
    * past the shorter array intersect to zero).
    */
  def bitmapAndCardinality(a: Array[Byte], b: Array[Byte]): Long = {
    val n = math.min(a.length, b.length)
    var i = 0
    var c = 0L
    while (i < n) {
      c += java.lang.Integer.bitCount(a(i) & b(i) & 0xFF)
      i += 1
    }
    c
  }
}
