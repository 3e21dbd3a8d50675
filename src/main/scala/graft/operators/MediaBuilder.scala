package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Media-frame assembly: union a list of per-media-type exposure
  * tables, join household projection factors, optionally re-scale by a
  * per-etype ratio table.
  *
  * Semantics: /root/reference/metrics/helpers/make_media.py:5-11
  * (`union_df_list`) and :27-46 (`make_df_dec`): select (household,
  * dim[, etype]) from each table, union, inner-join the deduped
  * projection table, and — when a second projection table exists —
  * multiply projfact by the etype's ratio.
  *
  * Spark-first notes: the unions are column-aligned selects (narrow,
  * no shuffle); the projection join keys on household_id (the fact
  * tables' natural key); the ratio table is tiny → broadcast. The
  * reference's missing-dimension ValueError becomes a require() at
  * plan-build time.
  */
object MediaBuilder {

  /** Union by the first frame's column set (make_media.py:5-11). */
  def unionDfList(dfs: Seq[DataFrame]): DataFrame = {
    val cols = dfs.head.columns.toSeq
    dfs.map(_.select(cols.map(col): _*)).reduce(_.unionAll(_))
  }

  def makeMedia(dfs: Seq[DataFrame], dim: String, projDf: DataFrame,
                ratioDf: Option[DataFrame]): DataFrame = {
    dfs.foreach(d => require(d.columns.contains(dim),
      s"dimension: $dim not found in at least one provided table"))
    val needEtype = ratioDf.isDefined && dim != "etype"
    val sel = if (needEtype) Seq("household_id", dim, "etype") else Seq("household_id", dim)
    val u = unionDfList(dfs.map(_.select(sel.map(col): _*)))
    val joined = u.join(projDf.dropDuplicates("household_id"), Seq("household_id"))
    ratioDf match {
      case Some(r) if dim != "etype" =>
        joined
          .withColumnRenamed("projfact", "proj")
          .join(broadcast(r), Seq("etype"))
          .withColumn("projfact", col("proj") * col("ratio"))
          .drop("proj", "ratio")
      case _ => joined
    }
  }
}
