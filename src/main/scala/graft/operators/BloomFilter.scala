package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-filter runtime pruning for selective joins.
  *
  * The 100 TB problem this solves: a semi/inner join whose dimension
  * side is selective but too large to broadcast-join outright still
  * shuffles EVERY fact row to the join, even though most fact rows
  * match nothing. Spark's own `InjectRuntimeFilter` does this
  * opportunistically; this operator is the explicit, composable form
  * (the reference has no joins at all — SURVEY.md §2.5 — so this is
  * beyond-reference surface, the "prune before you shuffle" tool a
  * corpus pipeline needs for e.g. "lineage rows of these flagged
  * documents").
  *
  * Mechanics:
  *  - [[build]] scans the DIM key column once and ORs per-key bit
  *    positions into an m-bit bitmap via a two-level aggregate
  *    (explode k positions → groupBy word → bit_or). The aggregate
  *    output is ≤ m/64 rows regardless of dim size — the collect is
  *    bounded by the PARAMETER m (default 2^20 bits = 128 KiB), never
  *    by the data, the same contract as broadcasting a dim.
  *  - [[mightContain]] turns the bitmap into a pure-builtin Column
  *    (xxhash64 + shift/mask on a literal word array): fully
  *    codegen'd, evaluated MAP-SIDE on the fact scan — the pruned
  *    rows never reach the join's exchange.
  *  - [[prunedSemiJoin]] composes probe + exact join. A Bloom filter
  *    has false positives but no false negatives, so the output is
  *    EXACTLY the plain semi-join (q_bloom_semi hash-checks this
  *    against a DuckDB EXISTS); false positives only cost shuffle
  *    rows, never correctness.
  *
  * Sizing: false-positive rate ≈ (1 − e^(−kn/m))^k; the default
  * m = 2^20, k = 5 holds fpp < 1% to n ≈ 100k dim keys. For larger
  * dims pass a larger `numBits` — the cost is linear in m and still
  * data-independent.
  *
  * Hashing: double hashing (Kirsch–Mitzenmacher 2006) over two
  * xxhash64 streams — position_i = h1 + i·h2 (mod m). xxhash64 is a
  * codegen'd builtin on both the build and probe side; the bloom
  * internals need no engine replay because the EXACT join behind the
  * probe makes the output sketch-free.
  */
object BloomFilter {

  /** A built filter: `words(w)` holds bits [64w, 64w+63] of the
    * m-bit bitmap. */
  final case class Bits(numBits: Int, numHashes: Int, words: Array[Long]) {
    def setBitCount: Long =
      words.foldLeft(0L)((a, w) => a + java.lang.Long.bitCount(w))
  }

  private def hash1(key: Column): Column = xxhash64(key)
  /** Independent second stream: same function, domain-separated by a
    * constant extra input. */
  private def hash2(key: Column): Column = xxhash64(key, lit("graft#bloom#h2"))

  /** The k probe positions of `key` in an m-bit table. Both hash
    * streams are reduced mod m BEFORE the double-hash combination —
    * identical positions (mod distributes over + and ×) without the
    * long overflow raw `h1 + i·h2` hits under ANSI arithmetic. */
  private def positions(key: Column, numBits: Int, numHashes: Int): Seq[Column] = {
    val m = lit(numBits.toLong)
    val a = pmod(hash1(key), m)
    val b = pmod(hash2(key), m)
    (0 until numHashes).map(i => pmod(a + lit(i.toLong) * b, m))
  }

  /** One narrow pass over `dim`: every key's k positions, OR'd into
    * ≤ numBits/64 words. Nulls are hashed like any value (xxhash64 of
    * a null input yields its seed) — harmless, since the exact join
    * behind the probe never matches null keys anyway. */
  def build(dim: DataFrame, keyCol: String,
            numBits: Int = 1 << 20, numHashes: Int = 5): Bits = {
    require(numBits > 0 && numBits % 64 == 0,
      s"numBits must be a positive multiple of 64, got $numBits")
    require(numHashes >= 1, s"numHashes must be >= 1, got $numHashes")
    val wordRows = dim
      .select(explode(array(positions(col(keyCol), numBits, numHashes): _*)).as("pos"))
      .select(
        call_function("shiftright", col("pos"), lit(6)).cast("int").as("w"),
        call_function("shiftleft", lit(1L),
          pmod(col("pos"), lit(64L)).cast("int")).as("bit"))
      .groupBy(col("w")).agg(bit_or(col("bit")).as("bits"))
      .collect()
    val words = new Array[Long](numBits / 64)
    wordRows.foreach(r => words(r.getInt(0)) = r.getLong(1))
    Bits(numBits, numHashes, words)
  }

  /** Membership probe as a pure-builtin boolean Column: true iff all
    * k bits of `key` are set. False only when the key is DEFINITELY
    * absent from the build side. */
  def mightContain(key: Column, bits: Bits): Column = {
    val words = typedlit(bits.words.toIndexedSeq)
    positions(key, bits.numBits, bits.numHashes).map { p =>
      val word = element_at(words,
        call_function("shiftright", p, lit(6)).cast("int") + lit(1))
      call_function("shiftright", word, pmod(p, lit(64L)).cast("int"))
        .bitwiseAND(lit(1L)) === lit(1L)
    }.reduce(_ && _)
  }

  /** `fact` rows whose `factKey` appears in `dim.dimKey` — the plain
    * left-semi join, with the bloom probe applied map-side FIRST so
    * non-matching fact rows are dropped before the join's exchange.
    * Output is exact (bit-identical to the unpruned semi-join). */
  def prunedSemiJoin(fact: DataFrame, factKey: String,
                     dim: DataFrame, dimKey: String,
                     numBits: Int = 1 << 20, numHashes: Int = 5): DataFrame = {
    val bits = build(dim, dimKey, numBits, numHashes)
    val pruned = fact.filter(mightContain(col(factKey), bits))
    pruned.join(dim, pruned(factKey) === dim(dimKey), "left_semi")
  }
}
