package graft
import org.apache.spark.sql.SparkSession
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = Engine.ready(Engine.configure(
      SparkSession.builder().master("local[8]").appName("plan-audit"), 8)
      .getOrCreate())
    val dir = "/root/testdata/sf0.001"
    val skipExec = Set("q_stream_wordcount", "q_stream_tumbling", "q_stream_dedup",
      "q_dedup_clusters") // streaming/iterative: no single static plan
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (!skipExec.contains(name)) {
        try {
          val p = fn(spark, dir).queryExecution.executedPlan.toString
          val cart = if (p.contains("CartesianProduct")) " CARTESIAN" else ""
          val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(p).size
          val smj = "SortMergeJoin".r.findAllIn(p).size
          val bhj = "BroadcastHashJoin".r.findAllIn(p).size
          val exch = "Exchange".r.findAllIn(p).size
          println(f"[audit] $name%-28s exch=$exch bhj=$bhj smj=$smj bnlj=$bnlj$cart")
        } catch { case e: Throwable =>
          println(s"[audit] $name FAILED ${e.getMessage.take(100)}")
        }
      }
    }
    spark.stop()
  }
}
