package graft

import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._
import graft.operators.NearDup

/** Scratch dev main — timing decomposition, not part of the library. */
object DevProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local()
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/sf1")
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[probe] $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val docs = NearDup.plantSpans(Tables.documents(spark, dir))
    val k = 8
    time("tokenize only") {
      docs.select(col("doc_id"), tokens(col("text")).as("toks"))
        .write.format("noop").mode("overwrite").save()
    }
    val seeds = docs
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .where(size(col("toks")) >= k)
      .select(col("doc_id"), explode(transform(
        sequence(lit(1), size(col("toks")) - (k - 1)),
        i => struct((i - 1).as("pos"),
          md5(concat_ws(" ", slice(col("toks"), i, lit(k)))).as("sk"))))
        .as("s"))
      .select(col("doc_id"), col("s.pos").as("pos"), col("s.sk").as("sk"))
    time("seed generation")(
      seeds.write.format("noop").mode("overwrite").save())
    println("[probe] seed rows " + seeds.count())
    val noMd5 = docs
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .where(size(col("toks")) >= k)
      .select(col("doc_id"), explode(transform(
        sequence(lit(1), size(col("toks")) - (k - 1)),
        i => struct((i - 1).as("pos"),
          concat_ws(" ", slice(col("toks"), i, lit(k))).as("sk"))))
        .as("s"))
      .select(col("doc_id"), col("s.pos").as("pos"), col("s.sk").as("sk"))
    time("seed generation no-md5")(
      noMd5.write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
