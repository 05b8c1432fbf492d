package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: BPE training wall-clock vs merge rounds vs batch size
  * (the driver-latency curve for Bpe.train's batching knob — VERDICT
  * r11 item 4). Prints rounds, batch, merges actually learned,
  * pair-count rounds executed (merges/batch upper bound), and wall.
  * Usage:
  *   runMain graft.tools.ProfileBpe <sfDir> <rounds,rounds,...> <batch,batch,...>
  */
object ProfileBpe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val roundsList = args.lift(1).getOrElse("8,64").split(",").map(_.trim.toInt)
    val batchList = args.lift(2).getOrElse("1,8").split(",").map(_.trim.toInt)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val localDir = LocalDirs.ramLocalDir("bpe")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.local.dir", localDir)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    docs.count() // untimed reader warm-up
    for (rounds <- roundsList; batch <- batchList) {
      val t0 = System.nanoTime()
      val merges = graft.ext.Bpe.train(docs, "text", rounds, batch).collect()
      val sec = (System.nanoTime() - t0) / 1e9
      val pc = graft.ext.Bpe.lastTrainStats.map(_._1).getOrElse(-1)
      println(f"[bpe] rounds=$rounds batch=$batch learned=${merges.length} pcRounds=$pc $sec%.2f s")
    }
    spark.stop()
  }
}
