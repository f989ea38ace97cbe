package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

/** Dev-only per-gate profiler: runs the named gates REPS times each
  * (default 3) through the bench's noop materialization, printing per-rep
  * wall seconds plus the Spark job count and summed job wall-clock in the
  * rep — the fixed-overhead diagnostic (many tiny jobs = scheduling/plan
  * floor, few long jobs = real work).
  *
  * Usage: SPARK_GRAFT_SF_DIR=... runMain graft.ProfGate q_a,q_b [reps]
  */
object ProfGate {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq
    val reps = if (args.length > 1) args(1).toInt else 3
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt)
      .getOrElse(Runtime.getRuntime.availableProcessors())
    val spark = Engine.ready(Engine.configure(
      SparkSession.builder().master(s"local[$cpus]").appName("prof-gate"),
      cpus).getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    @volatile var jobs = 0
    @volatile var jobMs = 0L
    val starts = scala.collection.concurrent.TrieMap.empty[Int, Long]
    val logJobs = sys.env.contains("PROF_JOBS")
    val sites = scala.collection.concurrent.TrieMap.empty[Int, String]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        starts(j.jobId) = j.time
        if (logJobs) sites(j.jobId) = Option(j.properties)
          .flatMap(p => Option(p.getProperty("callSite.short"))).getOrElse("?")
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        jobs += 1
        starts.remove(j.jobId).foreach { t0 =>
          jobMs += j.time - t0
          if (logJobs) println(f"[job] ${j.jobId}%4d ${j.time - t0}%5dms ${sites.remove(j.jobId).getOrElse("?")}")
        }
      }
    })
    // warmup: absorb first-job costs once
    SparkEntry.queries("q1_agg")(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    graft.queries.Scratch.release(spark)
    names.foreach { name =>
      (1 to reps).foreach { r =>
        jobs = 0; jobMs = 0L
        val t0 = System.nanoTime()
        try {
          SparkEntry.queries(name)(spark, sfDir)
            .write.format("noop").mode("overwrite").save()
        } catch { case e: Throwable =>
          println(s"[prof] $name rep$r FAILED: ${Verify.brief(e)}")
        } finally graft.queries.Scratch.release(spark)
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"[prof] $name rep$r wall=$sec%.2fs jobs=$jobs jobSec=${jobMs / 1e3}%.2f")
      }
    }
    spark.stop()
  }
}
