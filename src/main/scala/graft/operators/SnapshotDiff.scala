package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Snapshot differencing — change detection between two versions of a
  * keyed table (the reference's inventory/config drift use case:
  * README.md:20-38 tracks NOC element state across syncs; the training-
  * data twin is corpus-version diffing between crawl snapshots).
  *
  * diff() is ONE full-outer equi-join on the key: both sides hash-
  * partition on the key (the join's own exchanges — nothing extra), AQE
  * handles skew/size at runtime, and classification is pure column
  * expressions on the joined row. No window, no collect, no broadcast
  * requirement — snapshot×snapshot works at any scale where the join
  * does.
  *
  * applyChanges() is the inverse: old ⊕ changeset ≡ new (spec-asserted
  * round trip), which is what an incremental pipeline ships instead of
  * re-shipping the full snapshot.
  *
  * Comparison is NULL-SAFE (`<=>`): a column going value→NULL or
  * NULL→value is an update; NULL→NULL is unchanged.
  */
object SnapshotDiff {

  /** Classify every key across two snapshots. Output: keys ++ `change`
    * ('insert' | 'delete' | 'update' | 'same') ++ (old_c, new_c) per
    * compared column. 'insert' = key only in `newDf`; 'delete' = key
    * only in `oldDf`. */
  def diff(
      oldDf: DataFrame,
      newDf: DataFrame,
      keys: Seq[String],
      compare: Seq[String]): DataFrame = {
    // Presence markers survive the outer join even when compared (or
    // key-adjacent) columns are legitimately NULL on a present side.
    val l = oldDf.select(
      keys.map(col) ++ compare.map(c => col(c).as(s"old_$c")) :+ lit(1).as("_l"): _*)
    val r = newDf.select(
      keys.map(col) ++ compare.map(c => col(c).as(s"new_$c")) :+ lit(1).as("_r"): _*)
    val joined = l.join(r, keys, "full_outer")
    val changed = compare
      .map(c => !(col(s"old_$c") <=> col(s"new_$c")))
      .reduceOption(_ || _)
      .getOrElse(lit(false))
    joined
      .withColumn("change",
        when(col("_l").isNull, lit("insert"))
          .when(col("_r").isNull, lit("delete"))
          .when(changed, lit("update"))
          .otherwise(lit("same")))
      .drop("_l", "_r")
  }

  /** Apply a diff() changeset (rows with change ≠ 'same') to the old
    * snapshot: deletes/updates retire the old row, inserts/updates
    * supply the new one. Round trip: applyChanges(old, diff(old, new))
    * has the same rows as new (for the keyed+compared columns). */
  def applyChanges(
      oldDf: DataFrame,
      changes: DataFrame,
      keys: Seq[String],
      compare: Seq[String]): DataFrame = {
    val retired = changes
      .filter(col("change").isin("delete", "update"))
      .select(keys.map(col): _*)
    val kept = oldDf
      .select(keys.map(col) ++ compare.map(col): _*)
      .join(retired, keys, "left_anti")
    val incoming = changes
      .filter(col("change").isin("insert", "update"))
      .select(keys.map(col) ++ compare.map(c => col(s"new_$c").as(c)): _*)
    kept.unionByName(incoming)
  }
}
