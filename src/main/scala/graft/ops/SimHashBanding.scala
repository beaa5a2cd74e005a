package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared hamming-distance-3 candidate kernel for 64-bit signatures —
  * used by q73 (text SimHash) and q80 (image dHash).
  *
  * Candidate generation is the block-combination design of Manku,
  * Jain & Sarma, WWW'07 ("Detecting near-duplicates for web
  * crawling", §3): the 64-bit signature splits into 6 disjoint blocks
  * (4×11 + 2×10 bits), and a pair within hamming distance 3 has its
  * ≤3 differing bits inside at most 3 blocks — so at least 3 blocks
  * match EXACTLY, and some combination of 3 of the 6 blocks is
  * entirely clean. Keying every signature by all C(6,3) = 20
  * combinations (a ~32-bit key each) and equi-joining therefore
  * yields a superset of every true pair (pigeonhole-lossless), while
  * the exact `bit_count(xor)` verify keeps truth only.
  *
  * Why not single 16-bit bands (the round-6 kernel): 4×2^16 buckets
  * hold ~N/2^16 signatures each, so the self-join emits ~N²/2^15
  * candidates — at N = 10^9 that is ~10^13 pairs for perhaps ~10^9
  * true ones. The 20 combination keys span ~2^32 buckets each:
  * expected bucket occupancy stays O(1) until N ~ 4×10^9, and the
  * candidate volume is ~20·N²/2^32 — four orders of magnitude less
  * shuffle at web scale for 5× the (tiny, ids-only) key rows.
  *
  * Two further scale guards:
  *  - the band join runs over DISTINCT signatures, not doc rows:
  *    exact duplicates (the common case in web corpora) collapse to
  *    one signature before the join and are expanded back to doc
  *    pairs afterwards by keyed joins — a hot signature with 10^6
  *    copies costs one join row, not 10^6.
  *  - only (signature) and (id, signature) rows ever shuffle; token
  *    sets / payload bytes never enter the kernel.
  */
object SimHashBanding {

  /** Block layout: (bit offset, width) — 4×11 + 2×10 = 64 bits. */
  private val blocks: Seq[(Int, Int)] =
    Seq((0, 11), (11, 11), (22, 11), (33, 11), (44, 10), (54, 10))

  /** All C(6,3) = 20 combinations of 3 block indices. */
  private val combos: Seq[Seq[Int]] =
    blocks.indices.combinations(3).map(_.toSeq).toSeq

  /** SQL array of the 20 combination keys for `sigCol`: each key packs
    * the combination id (<<33) with the three 11-bit-slotted block
    * values — one BIGINT per combination, collision-free by
    * construction (shiftright-then-mask is sign-safe on BIGINT; the
    * function forms are used because `>>` inside `array(...)` trips
    * the parser's ARRAY<> type syntax). */
  private def comboKeysSql(sigCol: String): String = {
    val keys = combos.zipWithIndex.map { case (c, ci) =>
      val parts = c.zip(Seq(22, 11, 0)).map { case (bi, shift) =>
        val (off, w) = blocks(bi)
        s"shiftleft(shiftright($sigCol, $off) & ${(1L << w) - 1}L, $shift)"
      }
      s"shiftleft(${ci}L, 33) | ${parts.mkString(" | ")}"
    }
    s"array(${keys.mkString(", ")})"
  }

  /** Candidate pairs of DISTINCT signatures (sa < sb), pre-verify:
    * every pair sharing at least one 3-of-6 block combination.
    * Exposed for the candidate-volume bound test. */
  def sigCandidates(distinctSigs: DataFrame): DataFrame = {
    val keyed = distinctSigs
      .select(col("sig"), explode(expr(comboKeysSql("sig"))).as("k"))
    keyed.select(col("k"), col("sig").as("sa"))
      .join(keyed.select(col("k"), col("sig").as("sb")), "k")
      .filter(col("sa") < col("sb"))
      .select("sa", "sb")
      .dropDuplicates("sa", "sb")
  }

  /** All pairs (id_a < id_b, dist) at hamming distance ≤ 3 between the
    * 64-bit signatures of `rows` (columns `idCol`, `sigCol`).
    * Same-signature pairs come from a sig-keyed self-join (dist 0);
    * cross-signature pairs expand the verified distinct-sig candidate
    * pairs back through two keyed id joins.
    *
    * Scale contract: the KERNEL's work is near-linear in distinct
    * signatures, but the all-pairs OUTPUT itself is quadratic in each
    * duplicate group's size (a signature with m copies owns m·(m−1)/2
    * answer rows — that is the query's contract, not a kernel cost).
    * At web scale, consumers that only need group structure use the
    * group form (q28: one row per doc) or keep-one dedup (q47), and
    * clustering consumes edges per candidate pair, never the expanded
    * dist-0 closure. */
  def nearPairs(rows: DataFrame, idCol: String, sigCol: String): DataFrame = {
    // Contract: ids must be integral — the keyed joins run on the id
    // cast to long, and a silent cast of e.g. string doc keys would
    // NULL the ids and drop those rows without any error.
    import org.apache.spark.sql.types.{ByteType, ShortType, IntegerType, LongType}
    val idType = rows.schema(idCol).dataType
    require(Seq(ByteType, ShortType, IntegerType, LongType).contains(idType),
      s"nearPairs requires an integral id column; '$idCol' is $idType")
    // materialized: five consumers (distinct, both same-sig sides,
    // both cross-sig expansions) would re-run the signature lineage
    val sigs = rows
      .select(col(idCol).cast("long").as("id"), col(sigCol).cast("long").as("sig"))
      .localCheckpoint()
    val sigPairs = sigCandidates(sigs.select("sig").distinct())
      .withColumn("dist", expr("bit_count(sa ^ sb)").cast("bigint"))
      .filter(col("dist") <= 3)
    val same = sigs.select(col("sig"), col("id").as("id_a"))
      .join(sigs.select(col("sig"), col("id").as("id_b")), "sig")
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), lit(0L).as("dist"))
    val cross = sigPairs
      .join(sigs.select(col("sig").as("sa"), col("id").as("ia")), "sa")
      .join(sigs.select(col("sig").as("sb"), col("id").as("ib")), "sb")
      .select(least(col("ia"), col("ib")).as("id_a"),
        greatest(col("ia"), col("ib")).as("id_b"), col("dist"))
    same.unionByName(cross)
  }
}
