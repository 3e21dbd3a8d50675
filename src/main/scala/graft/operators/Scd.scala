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
}
