package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Round-14 g04 tier A/B (measurement-adjacent only): the r14 gate-SF
  * rewrite regressed the 100× tier (18.6 → 32 s), so each sub-change is
  * timed separately at the tier to find the offending leg:
  *   r13  — oe persist, withCommon = oe ⋈ adj(j1) ⋈ adj(j2) persisted,
  *          counts = three unions over the persisted frame;
  *   r14  — withCommon from explode(adj) ⋈ adj (no oe/withCommon
  *          persists), counts = one concat+explode pass;
  *   mixA — explode(adj) derivation + persisted withCommon + 3 unions;
  *   mixB — r13 derivation (oe persist, 2 joins) + concat+explode counts.
  * Usage: tools/run.sh graft.G04AB <dataDir> [variants...]
  */
object G04AB {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("scale_data/100x")
    val variants = if (args.length > 1) args.drop(1).toSet
      else Set("r13", "r14", "mixA", "mixB")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()
    // canary (Bench's): in-band proof for the A/B
    val can = (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      spark.range(200000000L).selectExpr("sum(id % 9973)").collect()
      (System.nanoTime() - t0) / 1e9
    }.min
    println(f"[g04ab] canary=$can%.3f dir=$dir")

    def base() = {
      val ev = Tables.events(spark, dir)
      val edges = ev.select(col("user_id").as("src"),
        (regexp_extract(col("props"), "[0-9]+", 0).cast("long") % 150).as("dst"))
      val und = edges.filter(col("src") =!= col("dst"))
        .select(least(col("src"), col("dst")).as("u"),
          greatest(col("src"), col("dst")).as("v"))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
      val deg = und.select(col("u").as("node"))
        .union(und.select(col("v").as("node")))
        .groupBy("node").agg(count(lit(1)).as("deg"))
      val o = und
        .join(deg.select(col("node").as("u"), (col("deg") * 1000000 + col("u")).as("ou")), "u")
        .join(deg.select(col("node").as("v"), (col("deg") * 1000000 + col("v")).as("ov")), "v")
      o.select(
        when(col("ou") < col("ov"), col("u")).otherwise(col("v")).as("a"),
        when(col("ou") < col("ov"), col("v")).otherwise(col("u")).as("b"))
    }
    def adjOf(oe: DataFrame) = oe.groupBy(col("a").as("ja"))
      .agg(sort_array(collect_list(col("b"))).as("nbrs"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    def wcJoin(oe: DataFrame, adj: DataFrame) = oe
      .join(adj.select(col("ja").as("j1"), col("nbrs").as("na")), col("a") === col("j1"))
      .join(adj.select(col("ja").as("j2"), col("nbrs").as("nb")), col("b") === col("j2"))
      .select(col("a"), col("b"), array_intersect(col("na"), col("nb")).as("common"))
      .filter(size(col("common")) > 0)
    def wcExplode(adj: DataFrame) = adj
      .select(col("ja").as("a"), col("nbrs").as("na"), explode(col("nbrs")).as("b"))
      .join(adj.select(col("ja").as("j2"), col("nbrs").as("nb")), col("b") === col("j2"))
      .select(col("a"), col("b"), array_intersect(col("na"), col("nb")).as("common"))
      .filter(size(col("common")) > 0)
    def countUnions(wc: DataFrame) = wc
      .select(col("a").as("node"), size(col("common")).cast("long").as("c"))
      .union(wc.select(col("b").as("node"), size(col("common")).cast("long").as("c")))
      .union(wc.select(explode(col("common")).as("node"), lit(1L).as("c")))
      .groupBy("node").agg(sum(col("c")).as("n_tri"))
      .orderBy("node")
    def countExplode(wc: DataFrame) = wc
      .select(explode(concat(
        array(struct(col("a").as("node"), size(col("common")).cast("long").as("c")),
          struct(col("b").as("node"), size(col("common")).cast("long").as("c"))),
        transform(col("common"), w => struct(w.as("node"), lit(1L).as("c"))))).as("e"))
      .groupBy(col("e.node").as("node")).agg(sum(col("e.c")).as("n_tri"))
      .orderBy("node")

    def run(name: String)(mk: () => DataFrame): Unit = {
      if (!variants(name)) return
      val ts = (1 to 2).map { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        val n = Eval.forcedCount(mk())
        val dt = (System.nanoTime() - t0) / 1e9
        (dt, n)
      }
      println(f"[g04ab] $name%-5s best=${ts.map(_._1).min}%7.2f s  " +
        f"runs=${ts.map(t => f"${t._1}%.2f").mkString(",")}  hash=${ts.head._2}")
    }

    run("r13") { () =>
      val oe = base().persist(StorageLevel.MEMORY_AND_DISK)
      val adj = adjOf(oe)
      val wc = wcJoin(oe, adj).persist(StorageLevel.MEMORY_AND_DISK)
      countUnions(wc)
    }
    run("r14") { () =>
      val adj = adjOf(base())
      countExplode(wcExplode(adj))
    }
    run("mixA") { () =>
      val adj = adjOf(base())
      val wc = wcExplode(adj).persist(StorageLevel.MEMORY_AND_DISK)
      countUnions(wc)
    }
    run("mixB") { () =>
      val oe = base().persist(StorageLevel.MEMORY_AND_DISK)
      val adj = adjOf(oe)
      countExplode(wcJoin(oe, adj))
    }
    spark.stop()
  }
}
