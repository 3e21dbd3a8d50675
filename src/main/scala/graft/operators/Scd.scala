package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension maintenance: the type-2 merge that keeps
  * dimension history as validity intervals. The reference republishes
  * whole dimension tables per run (hc.table overwrites via
  * pdf_to_table_excel's publishing); at 100 TB the Spark-native form
  * merges a (small) change batch into the interval table instead of
  * rewriting history from scratch.
  */
object Scd {

  /** SCD type-2 merge. `current` is the interval table (key, attrs…,
    * effective_from, effective_to with NULL = open row); `updates` is
    * the change batch (key, attrs…, `effCol` = the change instant),
    * ONE ROW PER KEY (pre-deduplicate a multi-change batch to its
    * latest — interval splitting inside one batch is a different
    * operator). Semantics per open row:
    *  - no update, or an update whose attrs are all NULL-safe-equal →
    *    passes through unchanged (an identical re-send is a no-op,
    *    not a new version);
    *  - a differing update → the open row CLOSES at the update
    *    instant and a new open row with the update's attrs begins
    *    there;
    *  - a brand-new key → a new open row.
    * Closed history rows always pass through untouched.
    *
    * Shape: history and pass-through rows never meet the update batch
    * — the only join is open-rows × updates, a key equi-join Spark
    * broadcasts when the change batch is small (the operational
    * case); everything else is row-local projection and union. The
    * output is key-partitionable for the next day's merge. */
  def merge2(current: DataFrame, updates: DataFrame, key: String,
             attrs: Seq[String], effCol: String): DataFrame = {
    val outCols = (key +: attrs) ++ Seq("effective_from", "effective_to")
    val hist = current.where(col("effective_to").isNotNull)
      .select(outCols.map(col): _*)
    val open = current.where(col("effective_to").isNull)
    val o = open.select((Seq(key, "effective_from") ++ attrs)
      .map(c => col(c).as(s"o_$c")): _*)
    val u = updates.select(((key +: attrs) :+ effCol)
      .map(c => col(c).as(s"u_$c")): _*)
    val j = o.join(u, col(s"o_$key") <=> col(s"u_$key"), "full_outer")
    val differs = attrs.map(a => !(col(s"o_$a") <=> col(s"u_$a")))
      .reduce(_ || _)
    val keepOpen = j
      .where(col(s"o_$key").isNotNull &&
        (col(s"u_$key").isNull || !differs))
      .select(col(s"o_$key").as(key) +: attrs.map(a => col(s"o_$a").as(a))
        :+ col(s"o_effective_from").as("effective_from")
        :+ lit(null).cast(open.schema("effective_to").dataType)
          .as("effective_to"): _*)
    val closed = j
      .where(col(s"o_$key").isNotNull && col(s"u_$key").isNotNull && differs)
      .select(col(s"o_$key").as(key) +: attrs.map(a => col(s"o_$a").as(a))
        :+ col(s"o_effective_from").as("effective_from")
        :+ col(s"u_$effCol").as("effective_to"): _*)
    val opened = j
      .where(col(s"u_$key").isNotNull &&
        (col(s"o_$key").isNull || differs))
      .select(col(s"u_$key").as(key) +: attrs.map(a => col(s"u_$a").as(a))
        :+ col(s"u_$effCol").as("effective_from")
        :+ lit(null).cast(open.schema("effective_to").dataType)
          .as("effective_to"): _*)
    hist.unionByName(keepOpen).unionByName(closed).unionByName(opened)
      .orderBy(col(key), col("effective_from"))
  }

  /** CDC log apply: fold a change log of upserts/deletes into a
    * snapshot, last-writer-wins by `seqCol`. `changes` carries
    * (key, attrs…, seqCol, opCol) with opCol ∈ {'U','D'} and at most
    * one row per (key, seq) — seq ties within a key are a caller
    * contract violation (ambiguous order), not resolved here. A key's
    * LATEST change decides it: 'U' upserts (update or insert), 'D'
    * deletes — even if earlier changes said otherwise, and a 'U'
    * after a 'D' resurrects the key. Untouched snapshot rows pass
    * through with version_seq = 0.
    *
    * Shape for 100 TB: the log is first reduced to latest-per-key —
    * a window over the CHANGE BATCH only (operationally small). The
    * corpus-sized snapshot then meets it in a BROADCAST left-outer
    * join (updates, deletes and pass-through resolve row-locally —
    * the snapshot never shuffles and a full-outer join, which Spark
    * cannot broadcast, never appears); inserts are the latest 'U'
    * rows anti-joined against the snapshot's KEY COLUMN only, so the
    * one shuffle that does touch the corpus carries a single pruned
    * column, not rows. This is the Delta/Iceberg MERGE access pattern
    * expressed in pure relational ops. */
  def applyCdc(snapshot: DataFrame, changes: DataFrame, key: String,
               attrs: Seq[String], seqCol: String, opCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val latest = changes
      .withColumn("_rn", row_number().over(
        Window.partitionBy(col(key)).orderBy(col(seqCol).desc)))
      .where(col("_rn") === 1)
      .select(col(key).as(s"u_$key") +:
        attrs.map(a => col(a).as(s"u_$a")) :+
        col(seqCol).as("u_seq") :+ col(opCol).as("u_op"): _*)
    val existing = snapshot.join(broadcast(latest),
      col(key) <=> col(s"u_$key"), "left_outer")
      .where(col("u_op").isNull || col("u_op") === "U")
      .select(col(key) +:
        attrs.map(a =>
          when(col("u_op") === "U", col(s"u_$a")).otherwise(col(a)).as(a)) :+
        coalesce(col("u_seq"), lit(0L)).as("version_seq"): _*)
    val inserted = latest.where(col("u_op") === "U")
      .join(snapshot.select(col(key).as(s"u_$key")), Seq(s"u_$key"),
        "left_anti")
      .select(col(s"u_$key").as(key) +:
        attrs.map(a => col(s"u_$a").as(a)) :+
        col("u_seq").as("version_seq"): _*)
    existing.unionByName(inserted).orderBy(col(key))
  }
}
