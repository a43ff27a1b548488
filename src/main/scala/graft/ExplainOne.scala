package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Dev tool: print the formatted physical plan of one (or more) queries —
  * `runMain graft.ExplainOne q79,q82 [sfDir]`. The per-operator audit loop
  * behind the PLANS.md notes (PlanDump regenerates the headline set; this
  * answers "what does THIS query's plan look like right now"). */
object ExplainOne {
  def main(args: Array[String]): Unit = {
    val prefixes = args.headOption.map(_.split(',').toSeq)
      .getOrElse(sys.error("usage: ExplainOne <qNN[,qNN...]> [sfDir]"))
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries
      .filter { case (name, _) => prefixes.exists(name.startsWith) }
      .toSeq.sortBy(_._1)
      .foreach { case (name, fn) =>
        println(s"\n===== $name =====")
        println(fn(spark, dir).queryExecution.explainString(ExplainMode.fromString("formatted")).trim)
      }
    spark.stop()
  }
}
