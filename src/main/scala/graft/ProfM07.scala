package graft

/** Dev-only micro-profiler for the m07 audio path: times the three
  * per-row phases (pcmWav encode, decode, fingerprint loop) over the
  * same corpus the gate builds, single-threaded, no Spark — isolates
  * per-row library overhead from scheduling. */
object ProfM07 {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import org.apache.spark.sql.functions._
    val texts = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("text")).filter(length(col("text")) > 0)
      .collect().map(_.getString(0))
    spark.stop()
    println(s"PROF m07 rows=${texts.length} " +
      s"bytes=${texts.map(_.length).sum}")
    val codec = graft.multimodal.WavCodec()
    val meta = graft.multimodal.MediaMeta("wav", 0, 0, 1, 0L)
    // 3 copies like the gate (exact + perturbed + base)
    val all = texts ++ texts ++ texts
    for (round <- 1 to 3) {
      var t0 = System.nanoTime()
      val wavs = all.map { t =>
        graft.multimodal.WavCodec.pcmWav(t.getBytes("UTF-8"), 1000f) }
      val tEnc = (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime()
      val pcms = wavs.map(w => codec.decode(w, meta))
      val tDec = (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime()
      var sink = 0L
      pcms.foreach { px =>
        val n = px.length
        val ws = new Array[Long](64); val cnt = new Array[Long](64)
        var tot = 0L; var j = 0
        while (j < n) {
          val w = ((j.toLong * 64) / n).toInt
          val v = (px(j) & 0xFF).toLong
          ws(w) += v; cnt(w) += 1; tot += v; j += 1
        }
        var sig = 0L; var i = 0
        while (i < 64) { if (ws(i) * n > tot * cnt(i)) sig |= (1L << i); i += 1 }
        sink ^= sig
      }
      val tFp = (System.nanoTime() - t0) / 1e9
      println(f"PROF round=$round enc=$tEnc%.3f dec=$tDec%.3f fp=$tFp%.3f sink=$sink")
      // parallel rounds: 32 threads hammer each phase — a wall-clock
      // far above single-thread/32 means a shared lock, not CPU
      def par[A](what: String)(work: Int => A): Unit = {
        val threads = 32
        val t0 = System.nanoTime()
        val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
        val chunk = (all.length + threads - 1) / threads
        val futs = (0 until threads).map { t =>
          pool.submit(new java.util.concurrent.Callable[Unit] {
            def call(): Unit = {
              var i = t * chunk
              val end = math.min(all.length, (t + 1) * chunk)
              while (i < end) { work(i); i += 1 }
            }
          })
        }
        futs.foreach(_.get())
        pool.shutdown()
        println(f"PROF round=$round par32 $what=${(System.nanoTime() - t0) / 1e9}%.3f")
      }
      par("enc")(i => graft.multimodal.WavCodec
        .pcmWav(all(i).getBytes("UTF-8"), 1000f))
      par("dec")(i => codec.decode(wavs(i), meta))
      par("probe") { i =>
        val in = graft.multimodal.WavCodec.audioInputStream(wavs(i))
        in.close()
      }
      par("readall") { i =>
        val in = graft.multimodal.WavCodec.audioInputStream(wavs(i))
        try in.readAllBytes() finally in.close()
      }
    }
  }
}
