package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.scalatest.funsuite.AnyFunSuite

/** Co-located joins via bucketing: both sides bucketed on the join key
  * → sort-merge join with ZERO exchanges. This is the 100 TB shape for
  * repeated big-big joins (pay the shuffle once at write time). */
class BucketedJoinSpec extends SparkSpec with AdaptiveSparkPlanHelper {
  import spark.implicits._

  test("join of two bucketed tables has no shuffle exchange") {
    val a = (1 to 1000).map(i => (i.toLong, s"a$i")).toDF("k", "va")
    val b = (1 to 1000).map(i => (i.toLong, i * 2.0)).toDF("k", "vb")
    Seq("bk_a", "bk_b").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(s"spark-warehouse/$t")
      if (loc.exists()) org.apache.commons.io.FileUtils.deleteDirectory(loc)
    }
    a.write.mode("overwrite").bucketBy(8, "k").sortBy("k").saveAsTable("bk_a")
    b.write.mode("overwrite").bucketBy(8, "k").sortBy("k").saveAsTable("bk_b")
    withSQLConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val j = spark.table("bk_a").join(spark.table("bk_b"), "k")
      assert(j.count() == 1000)
      val shuffles = collectWithSubqueries(j.queryExecution.executedPlan) {
        case s: ShuffleExchangeExec => s
      }
      assert(shuffles.isEmpty, j.queryExecution.executedPlan.toString)
    }
  }

  private def withSQLConf(pairs: (String, String)*)(f: => Unit): Unit = {
    val olds = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f finally olds.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
