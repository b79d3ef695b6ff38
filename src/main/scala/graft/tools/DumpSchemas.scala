package graft.tools
import org.apache.spark.sql.SparkSession
object DumpSchemas {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Sessions.local(8, "dump")
    graft.core.Tables.all.foreach { t =>
      val df = graft.core.Tables.load(spark, "/root/testdata/sf0.001", t)
      println(t + " :: " + df.schema.map(f => s"${f.name}:${f.dataType.simpleString}").mkString(", "))
    }
    spark.stop()
  }
}
