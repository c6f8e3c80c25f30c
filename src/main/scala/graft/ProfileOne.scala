package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler._
import scala.collection.mutable

/** Per-job profiler for one catalog query (guide §1: measure first).
  * Runs the named queries with a SparkListener recording, per Spark
  * job: wall ms, #stages, #tasks, shuffle read/write bytes, input
  * bytes — so a slow catalog entry can be attributed to a specific
  * action inside its pipeline instead of guessed at. Output is one
  * line per job plus a per-query total; warm run only (a first
  * throwaway run pays codegen/JIT so job times reflect steady state).
  */
object ProfileOne {
  private final case class JobRow(id: Int, desc: String, ms: Long,
    stages: Int, tasks: Int, shufR: Long, shufW: Long, in: Long)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        sys.env.getOrElse("SPARK_GRAFT_AQE_MIN_PART", "64k"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // Listener events arrive on the listener-bus thread while the main
    // thread clears/reads the collections between queries: all state
    // access goes through one lock, and `capture` is volatile so the
    // bus thread sees the flip promptly (ADVICE r13).
    val lock = new Object
    val jobs = mutable.ListBuffer.empty[JobRow]
    val starts = mutable.Map.empty[Int, (Long, String, Int)]
    val agg = mutable.Map.empty[Int, (Int, Long, Long, Long)]
    val stageToJob = mutable.Map.empty[Int, Int]
    @volatile var capture = false
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        if (capture) lock.synchronized {
          val d = Option(e.properties)
            .flatMap(p => Option(p.getProperty("spark.job.description")))
            .getOrElse("")
          starts(e.jobId) = (e.time, d, e.stageIds.size)
          e.stageIds.foreach(s => stageToJob(s) = e.jobId)
        }
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
        if (capture) lock.synchronized {
          stageToJob.get(e.stageId).foreach { j =>
            val m = e.taskMetrics
            val (t, sr, sw, in) = agg.getOrElse(j, (0, 0L, 0L, 0L))
            val (nsr, nsw, nin) =
              if (m == null) (0L, 0L, 0L)
              else (m.shuffleReadMetrics.totalBytesRead,
                m.shuffleWriteMetrics.bytesWritten,
                m.inputMetrics.bytesRead)
            agg(j) = (t + 1, sr + nsr, sw + nsw, in + nin)
          }
        }
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        if (capture) lock.synchronized {
          starts.remove(e.jobId).foreach {
            case (t0, d, ns) =>
              val (t, sr, sw, in) =
                agg.getOrElse(e.jobId, (0, 0L, 0L, 0L))
              jobs += JobRow(e.jobId, d, e.time - t0, ns, t, sr, sw, in)
          }
        }
    }
    spark.sparkContext.addSparkListener(listener)

    def mb(b: Long): String = f"${b / 1048576.0}%.1f"
    args.foreach { name =>
      val fn = SparkEntry.queries(name)
      fn(spark, sfDir).count() // warmup (codegen + JIT)
      Thread.sleep(300); System.gc()
      lock.synchronized {
        jobs.clear(); starts.clear(); agg.clear(); stageToJob.clear()
      }
      capture = true
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // heuristic drain before reading (bounded tool)
      capture = false
      val snap = lock.synchronized(jobs.toList)
      println(f"===== $name warm=$wall%.2fs jobs=${snap.size} " +
        f"jobms=${snap.map(_.ms).sum} =====")
      snap.sortBy(-_.ms).take(30).foreach { j =>
        println(f"  [job ${j.id}%4d] ${j.ms}%6d ms stages=${j.stages}%2d " +
          f"tasks=${j.tasks}%4d shufR=${mb(j.shufR)}MB " +
          f"shufW=${mb(j.shufW)}MB in=${mb(j.in)}MB  ${j.desc.take(90)}")
      }
    }
    spark.stop()
  }
}
