package graft

import org.apache.spark.sql.functions._
import graft.operators.Layout

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  private def spreadRef(v: Long): Long =
    (0 until 16).map(i => ((v >> i) & 1L) << (2 * i)).reduce(_ | _)

  test("spreadBits matches the bit-by-bit reference on the dim range") {
    val vals = Seq(0L, 1L, 2L, 3L, 5L, 127L, 128L, 511L, 512L, 1023L)
    val out = vals.toDF("v")
      .select(col("v"), Layout.spreadBits(col("v")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    vals.foreach(v => assert(out(v) == spreadRef(v), s"spread($v)"))
  }

  test("zValue interleaves x on even and y on odd bits") {
    val out = Seq((3L, 5L)).toDF("x", "y")
      .select(Layout.zValue(col("x"), col("y"))).head().getLong(0)
    assert(out == (spreadRef(3L) | (spreadRef(5L) << 1)))
  }

  test("zorderReport confines every file to a small (user, day) rectangle") {
    // a 128x128 grid of (user, epoch-hour) cells stepping 8 in each
    // dim — coverage across the whole plane, multiple z-files touched
    val rows = for { u <- 0L until 1024L by 8; h <- 0L until 1024L by 8 }
      yield (u, new java.sql.Timestamp(h * 3600L * 1000L))
    val df = rows.toDF("user_id", "ts")
    val out = Layout.zorderReport(df, files = 64).collect()
    assert(out.map(_.getLong(1)).sum == rows.size.toLong)
    assert(out.length <= 64)
    out.foreach { r =>
      // 64 files over 2^20 z-cells -> each file is a 128x128 rectangle
      assert(r.getLong(3) - r.getLong(2) <= 127L,
        s"user span too wide in file ${r.getInt(0)}")
      assert(r.getLong(5) - r.getLong(4) <= 127L,
        s"day span too wide in file ${r.getInt(0)}")
      assert(r.getDouble(6) <= 0.125 && r.getDouble(7) <= 0.125)
    }
  }

  test("writeZOrdered: written files bound BOTH dims' footer stats") {
    val rows = for { u <- 0L until 1024L by 8; h <- 0L until 1024L by 8 }
      yield (u, new java.sql.Timestamp(h * 3600L * 1000L))
    val df = rows.toDF("user_id", "ts")
    val out = java.nio.file.Files
      .createTempDirectory("graft-zorder").toString
    Layout.writeZOrdered(df, out, files = 64)
    val back = spark.read.parquet(out)
    assert(back.count() == rows.size.toLong, "rows preserved")
    assert(back.columns.toSeq == Seq("user_id", "ts"),
      "helper z columns must not leak into the layout")
    // per physical file, recompute the cell coordinates and check the
    // min/max rectangle a scan planner would prune with: range
    // boundary sampling can merge adjacent z-ranges, so the bound is
    // 2 z-widths (256 cells), still ~4x better per dim than the 1024
    // a single-dim sort leaves the trailing dimension
    val spans = back
      .select(input_file_name().as("f"),
        pmod(col("user_id"), lit(1024L)).as("ux"),
        pmod(expr("unix_timestamp(ts) div 3600"), lit(1024L)).as("ty"))
      .groupBy(col("f"))
      .agg((max(col("ux")) - min(col("ux"))).as("us"),
        (max(col("ty")) - min(col("ty"))).as("ts"))
      .collect()
    assert(spans.length > 8, "clustering must produce many files")
    spans.foreach { r =>
      assert(r.getLong(1) <= 255L, s"user span ${r.getLong(1)} too wide")
      assert(r.getLong(2) <= 255L, s"time span ${r.getLong(2)} too wide")
    }
  }

  test("fileSkipping: aligned z-files skip 7/8 of files on every probe") {
    // same full-coverage grid: 64 z-files are 128x128 ALIGNED
    // rectangles, and each 128-wide probe band intersects exactly the
    // 8 files of its band — skip_frac exactly 0.875, rows_frac 0.125,
    // in BOTH dimensions (the whole point of z-order vs linear sort)
    val rows = for { u <- 0L until 1024L by 8; h <- 0L until 1024L by 8 }
      yield (u, new java.sql.Timestamp(h * 3600L * 1000L))
    val out = Layout.fileSkipping(rows.toDF("user_id", "ts"),
      files = 64, nProbes = 8).collect()
    assert(out.length == 16)
    out.foreach { r =>
      assert(r.getLong(4) == 64L, "n_files")
      assert(r.getLong(5) == 8L, s"files_scanned for ${r.getString(0)}")
      assert(r.getDouble(6) == 0.875, "skip_frac")
      assert(r.getLong(7) == rows.size / 8L, "rows_scanned")
      assert(r.getDouble(8) == 0.125, "rows_frac")
    }
  }
}
