package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object G04Stats {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val ev = Tables.events(spark, "/root/testdata/sf0.1")
    val edges = ev.select(col("user_id").as("src"),
      (regexp_extract(col("props"), "[0-9]+", 0).cast("long") % 150).as("dst"))
    println("events=" + ev.count())
    val und = edges.filter(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("u"), greatest(col("src"), col("dst")).as("v")).distinct()
    println("und=" + und.count())
    val deg = und.select(col("u").as("node")).union(und.select(col("v").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    val o = und
      .join(deg.select(col("node").as("u"), (col("deg")*1000000+col("u")).as("ou")), "u")
      .join(deg.select(col("node").as("v"), (col("deg")*1000000+col("v")).as("ov")), "v")
    val oe = o.select(when(col("ou") < col("ov"), col("u")).otherwise(col("v")).as("a"),
      when(col("ou") < col("ov"), col("v")).otherwise(col("u")).as("b"))
    val od = oe.groupBy("a").agg(count(lit(1)).as("d"))
    println("oe=" + oe.count())
    od.agg(sum(col("d")*(col("d")-1)/2).as("wedges"), max("d"), count(lit(1))).show()
    spark.stop()
  }
}
