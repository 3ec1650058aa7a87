package graft.ops

import graft.Materialize.Ops
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot diff between two versions of a keyed table — the
  * data-reconciliation primitive behind incremental publishing, CDC
  * validation, and "what changed since yesterday" audits.
  *
  * Scale shape: one FULL OUTER sort-merge join keyed on the table key
  * (each side shuffles once); classification is a map-side expression
  * over the joined row. At 100 TB, pre-filter both sides with
  * partition-level checksums (e.g. a per-partition xxhash64 aggregate)
  * so partitions that hash equal skip the row-level join entirely.
  */
object Diff {

  /** Row-level classification: returns one row per key present in either
    * version with `change_type` in {added, removed, changed, unchanged}
    * (null-safe comparison over `compareCols`). Both versions' compare
    * columns ride along as `old_*` / `new_*` for downstream inspection.
    */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame, keys: Seq[String],
                   compareCols: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "need at least one key column")
    val o = oldDf.select(
      keys.map(col) ++ compareCols.map(c => col(c).as(s"old_$c")) :+
        lit(1).as("__in_old"): _*)
    val n = newDf.select(
      keys.map(col) ++ compareCols.map(c => col(c).as(s"new_$c")) :+
        lit(1).as("__in_new"): _*)
    val changed = compareCols
      .map(c => !(col(s"old_$c") <=> col(s"new_$c")))
      .reduceOption(_ || _).getOrElse(lit(false))
    o.join(n, keys, "full_outer")
      .withColumn("change_type",
        when(col("__in_old").isNull, "added")
          .when(col("__in_new").isNull, "removed")
          .when(changed, "changed")
          .otherwise("unchanged"))
      .drop("__in_old", "__in_new")
  }

  /** The one-line audit summary: counts per change type. */
  def diffSummary(oldDf: DataFrame, newDf: DataFrame, keys: Seq[String],
                  compareCols: Seq[String]): DataFrame =
    snapshotDiff(oldDf, newDf, keys, compareCols)
      .groupBy(col("change_type"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("change_type"))

  /** Apply a CDC changelog to a keyed snapshot (the MERGE INTO / upsert
    * primitive that [[snapshotDiff]] validates): the changelog carries
    * (key, `seqCol`, `opCol`, payload) rows where op `D` deletes the key
    * and any other op (`I`/`U`) upserts the payload; per key the row with
    * the HIGHEST sequence wins (last-writer-wins). Keys untouched by the
    * changelog pass through from the base snapshot.
    *
    * Scale shape: the changelog first collapses to one row per key via a
    * partial-aggregating max_by (no window — hot keys with many updates
    * combine map-side), then ONE full-outer sort-merge join against the
    * base. The base shuffles once; a changelog far smaller than the base
    * broadcast-joins automatically under AQE.
    */
  def cdcApply(base: DataFrame, changelog: DataFrame, keys: Seq[String],
               seqCol: String, opCol: String): DataFrame = {
    require(keys.nonEmpty, "need at least one key column")
    val payload = base.columns.filterNot(keys.contains).toSeq
    require(payload.forall(changelog.columns.contains),
      "changelog must carry every base payload column")
    // one row per key: max_by over (seq) — deterministic given unique
    // sequence numbers per key (the CDC contract)
    val latest = changelog.groupBy(keys.map(col): _*)
      .agg(max_by(struct((Seq(opCol) ++ payload).map(col): _*), col(seqCol))
        .as("__w"))
      .select(keys.map(col) :+ col("__w.*"): _*)
      .withColumnRenamed(opCol, "__op")
      .select(keys.map(col) ++ payload.map(c => col(c).as(s"__new_$c")) :+
        col("__op"): _*)
    base.join(latest, keys, "full_outer")
      .filter(!(col("__op") <=> lit("D")))
      .select(keys.map(col) ++ payload.map(c =>
        when(col("__op").isNotNull, col(s"__new_$c"))
          .otherwise(col(c)).as(c)): _*)
  }

  /** Order-independent per-bucket fingerprints: rows hash to `nBuckets`
    * buckets by key, each bucket aggregates (row count, SUM of the
    * 31-bit-truncated row hash, XOR of the full row hash). Sum and xor
    * are commutative, so partial (map-side) aggregation applies and the
    * fingerprint is layout-independent; the 31-bit truncation keeps the
    * ANSI-mode sum overflow-free below 2^32 rows per bucket.
    */
  def bucketChecksums(df: DataFrame, keys: Seq[String],
                      compareCols: Seq[String], nBuckets: Int): DataFrame = {
    val rowHash = xxhash64((keys ++ compareCols).map(col): _*)
    df.select(pmod(xxhash64(keys.map(col): _*), lit(nBuckets.toLong))
        .as("__bucket"),
        rowHash.as("__rh"))
      .groupBy(col("__bucket"))
      .agg(count(lit(1)).as("__n"),
        sum(col("__rh").bitwiseAND(lit(0x7FFFFFFFL))).as("__sum"),
        // xor aggregate via sum-free fold: bit_xor is not a builtin
        // aggregate in this Spark, so fold two independent sums of
        // disjoint hash halves instead — together with __sum these make
        // a cancellation-resistant fingerprint
        sum(shiftrightunsigned(col("__rh"), 33)).as("__hi"))
  }

  /** Checksum-pruned snapshot diff summary — the 100 TB path: both
    * versions first reduce to `nBuckets` fingerprints (map-side combine,
    * nBuckets rows shuffled); only rows of buckets whose fingerprints
    * DISAGREE enter the row-level full-outer join. Buckets that agree are
    * credited to `unchanged` from the fingerprint counts alone (a
    * disagreement-masking hash collision needs equal count, truncated-sum
    * and high-half-sum simultaneously). Equal snapshots therefore never
    * pay a row-level join at all.
    */
  def diffSummaryPruned(oldDf: DataFrame, newDf: DataFrame, keys: Seq[String],
                        compareCols: Seq[String],
                        nBuckets: Int = 1 << 12): DataFrame = {
    val co = bucketChecksums(oldDf, keys, compareCols, nBuckets)
    val cn = bucketChecksums(newDf, keys, compareCols, nBuckets)
    val cmp = co.select(col("__bucket"), col("__n").as("__no"),
        col("__sum").as("__so"), col("__hi").as("__ho"))
      .join(cn.select(col("__bucket"), col("__n").as("__nn"),
        col("__sum").as("__sn"), col("__hi").as("__hn")),
        Seq("__bucket"), "full_outer")
      .materialize
    val dirty = cmp.filter(
      !(col("__no") <=> col("__nn")) || !(col("__so") <=> col("__sn")) ||
        !(col("__ho") <=> col("__hn")))
      .select(col("__bucket"))
    val cleanUnchanged = cmp.filter(
      col("__no") <=> col("__nn") && col("__so") <=> col("__sn") &&
        col("__ho") <=> col("__hn"))
      .agg(coalesce(sum(col("__no")), lit(0L)).as("n"))
      .select(lit("unchanged").as("change_type"), col("n"))
    def prune(df: DataFrame): DataFrame =
      df.join(broadcast(dirty),
        pmod(xxhash64(keys.map(col): _*), lit(nBuckets.toLong)) ===
          col("__bucket"), "left_semi")
    val dirtyCounts = snapshotDiff(prune(oldDf), prune(newDf), keys,
        compareCols)
      .groupBy(col("change_type")).agg(count(lit(1)).as("n"))
    dirtyCounts.unionByName(cleanUnchanged)
      .groupBy(col("change_type")).agg(sum(col("n")).as("n"))
      .filter(col("n") > 0)
      .orderBy(col("change_type"))
  }
}
