package graft

object Bench {
  /** Headline queries (SURVEY.md §6): the reference-surface metrics +
    * scan-bound pipeline ops. Quadratic oracle baselines (brute-force
    * knn, all-pairs cosine) are excluded — their scale path
    * (IVF/LSH/minhash) is what gets benched. */
  val headline: Seq[String] = Seq(
    "q1_pricing_summary", "q_revenue_by_nation", "q_top_orders_per_cust",
    "q_event_windows", "q_reach_overall", "q_reach_by_type", "q_frequency",
    "q_pairwise_matrix", "q_pairwise_pairs", "q_reach_week",
    "q_projection_ratio", "q_value_mapping", "q_before_after",
    "q_contingency", "q_qa_daily", "q_qa_meta", "q_qa_multigroup",
    "q_qa_flags", "q_lang_id",
    "q_text_quality", "q_token_count", "q_fingerprint", "q_repetition",
    "q_quality_filter", "q_dedup_exact",
    "q_ngram_jaccard", "q_minhash_dedup", "q_dedup_clusters", "q_simhash",
    "q_embed_lsh", "q_ann_ivf", "q_ann_ivf_p2", "q_ann_pq",
    "q_multimodal_meta")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local()
    // warm the JVM/codegen once on the smallest table so the first
    // timed query doesn't pay one-time session costs
    spark.read.parquet(s"$sfDir/region.parquet").count()
    // Fail loud: a crashing query records -1 (never a plausible time),
    // is named in the errors list, and fails the whole bench run — a
    // silently-swallowed failure would read as a very fast success and
    // mask a regression in exactly the artifact the driver grades.
    val results = headline.map { name =>
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      // noop sink forces full evaluation of every column (count() would
      // let Spark prune the plan)
      try {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (name, (System.nanoTime() - t0) / 1e9, None: Option[Throwable])
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: $e")
          (name, -1.0, Some(e))
      }
    }
    val qs = results.map { case (k, v, _) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, _, Some(_)) => k }
    val errs = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir"}""")
    spark.stop()
    if (failed.nonEmpty) sys.exit(1)
  }
}
