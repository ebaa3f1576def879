package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object CountNodes {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = graft.SparkEntry.queries("marc_tosolr_assembly")
    val df = fn(spark, "/root/testdata/sf0.001")
    val analyzed = df.queryExecution.analyzed
    def cnt(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Int = {
      var n = 0
      p.foreach(node => node.expressions.foreach(e => e.foreach(_ => n += 1)))
      n
    }
    println("analyzed total: " + cnt(analyzed))
    val opt = df.queryExecution.optimizedPlan
    println("optimized total: " + cnt(opt))
    // per-column on the top project of analyzed
    analyzed match {
      case p: org.apache.spark.sql.catalyst.plans.logical.Project =>
        p.projectList.foreach { ne =>
          var n = 0; ne.foreach(_ => n += 1)
          println(f"analyzed col ${ne.name}%-22s $n%8d")
        }
      case _ => println("top not project: " + analyzed.getClass)
    }
    opt match {
      case p: org.apache.spark.sql.catalyst.plans.logical.Project =>
        p.projectList.foreach { ne =>
          var n = 0; ne.foreach(_ => n += 1)
          println(f"opt col ${ne.name}%-22s $n%8d")
        }
      case _ => println("opt top not project: " + opt.getClass)
    }
    spark.stop()
  }
}
