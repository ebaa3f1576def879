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
    // Duplicate-subtree census over the whole optimized plan: the
    // factoring targets are big subtrees appearing >1 time (potential
    // saving = size * (count - 1)).
    val counts = scala.collection.mutable.Map.empty[String, (Int, Int, String)]
    def size(e: org.apache.spark.sql.catalyst.expressions.Expression): Int = {
      var n = 0; e.foreach(_ => n += 1); n
    }
    opt.foreach { node =>
      node.expressions.foreach { top =>
        top.foreach { e =>
          val s = size(e)
          if (s >= 150) {
            val k = e.canonicalized.toString
            val (c, _, _) = counts.getOrElse(k, (0, s, ""))
            counts(k) = (c + 1, s, e.toString.take(140))
          }
        }
      }
    }
    counts.toSeq
      .filter(_._2._1 > 1)
      .sortBy { case (_, (c, s, _)) => -(s * (c - 1)) }
      .take(25)
      .foreach { case (_, (c, s, repr)) =>
        println(f"DUP count=$c%3d size=$s%6d saving=${s * (c - 1)}%7d  $repr")
      }
    spark.stop()
  }
}
