package graft.tools

import org.apache.spark.sql.SparkSession
import graft.ops.AsOfJoin
import graft.sources.SynthImages

/** Head-to-head of the two as-of formulations (union+window built-ins vs the
  * custom AsOfMergeJoinExec) on identical synthesized input — decides which
  * one the flagship pipeline should default to. */
object AsOfBench {
  def main(args: Array[String]): Unit = {
    val nRows = sys.env.getOrElse("SPARK_GRAFT_ASOF_ROWS", "2000000").toLong
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val imgs = SynthImages.images(spark, nRows, 1024, 4.0 / 1024)
      .select("image_id", "phash", "ts")
    val lbls = SynthImages.labels(spark, nRows, 1024)
    imgs.cache().count(); lbls.cache().count()

    def time(name: String)(f: => Long): Unit = {
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        val n = f
        println(f"[asof-bench] $name pass$i rows=$n secs=${(System.nanoTime() - t0) / 1e9}%.3f")
      }
    }
    time("union+window") {
      AsOfJoin.asOf(imgs, lbls, "phash", "ts", "label_ts", Seq("label", "weight")).count()
    }
    time("merge-exec") {
      AsOfJoin.asOfSortMerge(imgs, lbls, "phash", "ts", "label_ts", Seq("label", "weight")).count()
    }
    spark.stop()
  }
}
