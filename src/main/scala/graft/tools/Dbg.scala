package graft
object Dbg {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").config("spark.sql.shuffle.partitions","4")
      .config("spark.sql.session.timeZone","UTC")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      val df = graft.operators.TimeQueries.qHoltWinters(spark, "/tmp/degen")
      df.show()
    } catch { case e: Throwable => e.printStackTrace() }
    spark.stop()
  }
}
