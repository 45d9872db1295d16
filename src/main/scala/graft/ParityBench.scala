package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Head-to-head throughput against the reference implementation's own
  * single-threaded pipeline — see tools/bench_parity.py, which
  * generates the shared corpus and times the reference
  * (textract_to_records + normalize_to_csv_format,
  * /root/reference/lambda_function.py:570-764). This main times
  * FarmPipeline end to end (blocks → lines → fold → 13-column
  * projection) over the same parquet at local[1] (the fair
  * single-core comparison) and local[N] (the scale headline). Two
  * passes each, best reported (pass 1 absorbs codegen/JIT).
  */
object ParityBench {
  def main(args: Array[String]): Unit = {
    val path = args.headOption.getOrElse("/tmp/parity_bench/blocks.parquet")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    for (threads <- Seq("1", cpus)) {
      val spark = SparkSession.builder()
        .master(s"local[$threads]")
        .config("spark.sql.shuffle.partitions", threads)
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      import spark.implicits._
      val blocks = spark.read.parquet(path)
        .select($"doc", $"seq", $"BlockType", $"Text",
          $"Page".cast("int").as("Page"),
          struct(struct($"Left", $"Top",
            lit(0.1).as("Width"), lit(0.01).as("Height")).as("BoundingBox"))
            .as("Geometry"))
      val nDocs = blocks.select($"doc").distinct().count()
      def run(): (Double, Long) = {
        val t0 = System.nanoTime()
        val out = parity.FarmPipeline.toCsvFormat(
          parity.FarmPipeline.assembleRecords(
            parity.FarmPipeline.linesFromBlocks(blocks)))
        val rows = out.count()
        ((System.nanoTime() - t0) / 1e9, rows)
      }
      val (t1, _) = run()
      val (t2, rows) = run()
      val best = math.min(t1, t2)
      println(f"graft local[$threads%s]: $nDocs%d docs -> $rows%d rows " +
        f"in $best%.2f s = ${nDocs / best}%.0f docs/s")
      spark.stop()
    }
  }
}
