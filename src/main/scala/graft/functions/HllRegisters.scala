package graft.functions

/** Deterministic register-array HyperLogLog (p = 12 → 4096 one-byte
  * registers) backing the STREAMING byte-identity law
  * (`EventStream.hllSketchTws` / StreamingSpec), the distinct-count
  * sibling of [[CmsDims]].
  *
  * Why not Spark's built-in `hll_sketch_agg` (Apache DataSketches): that
  * is the right BATCH surface (`stats_hll_mergeable`), but its serialized
  * form is mode- and history-dependent (LIST → SET → HLL promotions as
  * cardinality grows), so "shard sketches merge to the same bytes as one
  * global sketch" is not a statable law over it. A plain register array
  * has ONE canonical form — register(i) = max ρ observed for slot i — and
  * register-wise `max` merge is commutative, associative AND idempotent,
  * so any shard split / micro-batch order / duplicate delivery of the
  * same key multiset folds to IDENTICAL bytes. That is exactly the
  * replayable-state guarantee a streaming monitor needs, and the law
  * StreamingSpec pins.
  *
  * Hash: murmur3 fmix64 avalanche over the long key — full-entropy,
  * engine-independent, no seed state. Estimator: classic HLL
  * (α·m²/Σ2^-reg) with the linear-counting small-range correction; the
  * 64-bit hash makes the large-range correction unnecessary. Relative
  * error ≈ 1.04/√4096 ≈ 1.6%; Round14PropertySpec/StreamingSpec gate the
  * estimate against the exact distinct count at a 3σ band.
  */
private[graft] object HllRegisters {
  val P = 12
  val M: Int = 1 << P // 4096 registers, one byte each

  def empty(): Array[Byte] = new Array[Byte](M)

  /** MurmurHash3 fmix64 finalizer: bijective full-avalanche 64-bit mix. */
  def hashLong(x0: Long): Long = {
    var x = x0
    x ^= x >>> 33; x *= 0xff51afd7ed558ccdL
    x ^= x >>> 33; x *= 0xc4ceb9fe1a85ec53L
    x ^= x >>> 33
    x
  }

  /** Fold one key: slot = top P hash bits, ρ = 1-based position of the
    * first 1 among the remaining bits (capped at 64−P+1 by the sentinel).
    */
  def add(regs: Array[Byte], key: Long): Unit = {
    val h = hashLong(key)
    val idx = (h >>> (64 - P)).toInt
    val rho = (java.lang.Long.numberOfLeadingZeros(
      (h << P) | (1L << (P - 1))) + 1).toByte
    if (rho > regs(idx)) regs(idx) = rho
  }

  /** Register-wise max into a NEW array (inputs untouched). */
  def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    require(a.length == M && b.length == M, "register width mismatch")
    val out = new Array[Byte](M)
    var i = 0
    while (i < M) { out(i) = if (a(i) >= b(i)) a(i) else b(i); i += 1 }
    out
  }

  private val Alpha = 0.7213 / (1.0 + 1.079 / M)

  def estimate(regs: Array[Byte]): Double = {
    var invSum = 0.0
    var zeros = 0
    var i = 0
    while (i < M) {
      invSum += java.lang.Math.scalb(1.0, -regs(i).toInt)
      if (regs(i) == 0) zeros += 1
      i += 1
    }
    val raw = Alpha * M.toDouble * M.toDouble / invSum
    if (raw <= 2.5 * M && zeros > 0) M * math.log(M.toDouble / zeros)
    else raw
  }
}
