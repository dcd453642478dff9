package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Within-bucket unordered-pair generation with OVERSIZED-BUCKET
  * handling — the one 100 TB hazard of the `collect_list` pair-gen
  * pattern (LSH bands, simhash bands, prefix-filter candidates): an
  * exact-duplicate class lands whole in one bucket, and a size-g group
  * buffer is O(g) in a single aggregation buffer. The fix is two-level
  * SALTED pair generation:
  *
  *  - each member of a size-g bucket gets a salt
  *    t = hash(id) mod s, with s = ⌈g / cap⌉;
  *  - the bucket's C(g, 2) pairs split into s intra-salt cells (t, t)
  *    and C(s, 2) inter-salt cells (t1, t2), t1 < t2;
  *  - a member with salt t materializes in exactly the s cells
  *    containing t, so every unordered pair {x, y} appears in exactly
  *    ONE cell — (min(tx, ty), max(tx, ty)) — and the result multiset
  *    is IDENTICAL to the single-bucket form;
  *  - each cell's aggregation buffer holds ≤ ~2·cap members (the two
  *    salt classes), and the cells of one mega-bucket hash-spread
  *    across the cluster, so neither memory nor CPU concentrates in
  *    one task.
  *
  * When g ≤ cap this degenerates to s = 1, salt 0, one cell — byte-for
  * -byte the original within-bucket generation. Replication cost for
  * oversized buckets is g·s member-cell rows ≈ g²/cap, the same order
  * as the pair output itself, so the salting never dominates.
  *
  * Member-cell rows split into a LEFT list (salt = c1) and RIGHT list
  * (salt = c2) per cell, so inter-salt cells generate exactly
  * |L|·|R| raw rows (no post-filter discard) and intra-salt cells the
  * usual half-kept n² — a 4× raw-row cut versus single-list
  * generation at the 100k-duplicate-class stress point.
  */
object PairGen {

  /** Largest group a single aggregation buffer may hold. ~4k structs
    * keeps a buffer in the low MBs even with signature arrays riding
    * along; at 100 TB the knob trades buffer size against member
    * replication (g²/cap cell rows for a size-g bucket).
    */
  val DefaultCap = 4096

  /** All unordered member pairs within each bucket of `members`.
    *
    * @param members one row per (bucket, member): the bucket key
    *                columns `keys` plus a struct column `v` whose
    *                field `idField` is unique within a bucket and
    *                orders the output pair.
    * @return columns (a, b): the two member structs, a.idField <
    *         b.idField, one row per unordered pair per bucket (so a
    *         pair sharing k buckets yields k rows — callers distinct()
    *         or count multiplicity as before).
    *
    * The group size comes from a bucket-partitioned window count, not
    * a count+join: `members` stays a SINGLE plan tree (expensive
    * upstreams execute once with no checkpoint), the pair generation
    * costs exactly two exchanges (window keys, then cell keys), and a
    * mega-bucket in the window buffer SPILLS to disk
    * (ExternalAppendOnlyUnsafeRowArray) instead of growing one
    * aggregation buffer — so even the size-counting stage is safe on
    * an exact-duplicate class.
    */
  def saltedPairs(members: DataFrame, keys: Seq[String], idField: String,
                  cap: Int = DefaultCap): DataFrame = {
    require(cap > 1, s"cap must exceed 1, got $cap")
    val k = keys.map(col)
    val id: Column => Column = _.getField(idField)
    val w = org.apache.spark.sql.expressions.Window.partitionBy(k: _*)
    val salted = members
      .withColumn("_g", count(lit(1)).over(w))
      .filter(col("_g") > 1)
      .withColumn("_s", ceil(col("_g").cast("double") / cap).cast("int"))
      .withColumn("_t", pmod(hash(id(col("v"))), col("_s")))
    // A member with salt t fans out to its s cells (min(t,j), max(t,j))
    // — for j = t that is the intra cell, emitted exactly once.
    val cells = salted
      .select((k :+ col("_t") :+ col("v") :+
        explode(sequence(lit(0), col("_s") - 1)).as("_j")): _*)
      .withColumn("_c1", least(col("_t"), col("_j")))
      .withColumn("_c2", greatest(col("_t"), col("_j")))
    // The cell aggregation shuffles on (keys, c1, c2): a mega-bucket's
    // cells spread across the cluster instead of stacking in one task.
    // collect_list skips the nulls of an un-otherwise'd `when`, so one
    // pass splits each cell into its two salt classes.
    val grouped = cells
      .groupBy((k :+ col("_c1") :+ col("_c2")): _*)
      .agg(
        collect_list(when(col("_t") === col("_c1"), col("v"))).as("ll"),
        collect_list(when(col("_t") =!= col("_c1"), col("v"))).as("rr"))
    // Intra cell (c1 = c2): pairs within ll, kept when x.id < y.id.
    // Inter cell (c1 < c2): full ll × rr, ordered into (a, b) by id.
    grouped
      .select(col("_c1"), col("_c2"),
        explode(col("ll")).as("x"),
        when(col("_c1") === col("_c2"), col("ll")).otherwise(col("rr")).as("yy"))
      .select(col("_c1"), col("_c2"), col("x"), explode(col("yy")).as("y"))
      .filter(col("_c1") =!= col("_c2") || id(col("x")) < id(col("y")))
      .select(
        when(id(col("x")) < id(col("y")), col("x")).otherwise(col("y")).as("a"),
        when(id(col("x")) < id(col("y")), col("y")).otherwise(col("x")).as("b"))
  }
}
