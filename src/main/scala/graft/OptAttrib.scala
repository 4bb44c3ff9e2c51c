package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-13 optimization attribution harness (guide §1: measure first).
  *
  * Times the SUB-PHASES of the bench's most expensive gate families so
  * optimization effort lands on the phase that actually costs, not the
  * one inferred from end-to-end totals — the ScaleAttrib discipline
  * applied to the r13 per-query table. Each phase is best-of-3 on a
  * cache-cleared session, same session shape as Bench.
  *
  * Usage: `tools/run.sh graft.OptAttrib [sfDir]`
  */
object OptAttrib {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0)
      else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-warehouse").toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/region.parquet").count()

    def time(name: String)(thunk: () => Unit): Unit = {
      val ts = (1 to 3).map { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        thunk()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[attrib] $name%-28s best=${ts.min}%6.3f  runs=${ts.map(t => f"$t%.3f").mkString(",")}")
    }
    def fc(df: DataFrame): Unit = { Eval.forcedCount(df); () }

    import graft.operators.Similarity
    val NumCentroids = 8; val NumQueries = 5; val K = 10; val NProbe = 2
    val emb = Tables.embeddings(spark, sfDir)
    println(s"[attrib] embeddings rows=${emb.count()}")

    // --- base corpus pass cost ---
    time("emb_quantize_scan") { () =>
      fc(emb.select(col("vec_id"), Similarity.quantize(col("embedding")).as("q")))
    }

    // --- IVF-PQ store family (e19/e24/e26/e29/e30/e31/x23) ---
    val store = graft.queries.Dsl.tempStore("attrib_ivfpq")
    time("ivfpq_build_store") { () =>
      Similarity.buildIvfPqStore(emb, "vec_id", "embedding",
        col("id") >= NumCentroids && col("id") < NumCentroids + 4,
        col("id") < NumCentroids, store)
    }
    time("ivfpq_stored_topk") { () =>
      fc(Similarity.ivfPqStoredTopK(spark, store,
        emb.filter(col("vec_id") < NumQueries), "vec_id", "embedding", K, NProbe))
    }

    // --- e21 legs ---
    time("e21_knn_brute_truth") { () =>
      fc(Similarity.knnBrute(emb, "vec_id", "embedding", col("id") < NumQueries, K))
    }
    time("e21_ivfpqadc_np1") { () =>
      fc(Similarity.knnIvfPqAdc(emb, "vec_id", "embedding",
        col("id") >= NumCentroids && col("id") < NumCentroids + 4,
        col("id") < NumCentroids, col("id") < NumQueries, K, 1))
    }

    // --- e24/e26 legs ---
    val qTokens = emb.filter(pmod(col("vec_id"), lit(100)) < 2)
    val cand = Similarity.ivfPqStoredTopK(spark, store, qTokens,
        "vec_id", "embedding", K, NProbe)
      .select(pmod(col("q_id"), lit(100)).as("qd"),
        pmod(col("n_id"), lit(100)).as("cd"))
      .filter(col("cd") =!= col("qd")).distinct()
      .collect()
    val candDf = spark.createDataFrame(
      java.util.Arrays.asList(cand: _*),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("qd",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("cd",
          org.apache.spark.sql.types.LongType))))
    time("e24_stored_topk_tokens") { () =>
      fc(Similarity.ivfPqStoredTopK(spark, store, qTokens,
        "vec_id", "embedding", K, NProbe))
    }
    time("e26_maxsim_truth_full") { () =>
      fc(Similarity.maxSimTopK(emb, "vec_id", "embedding", 100, 2, 5))
    }
    time("e26_maxsim_shortlist") { () =>
      fc(Similarity.maxSimTopKShortlist(emb, "vec_id", "embedding", 100, 2,
        candDf, 5))
    }

    // --- x23 forget / e29 admit legs (store mutation; rebuild between) ---
    time("x23_forget_only") { () =>
      val s2 = graft.queries.Dsl.tempStore("attrib_forget")
      Similarity.buildIvfPqStore(emb, "vec_id", "embedding",
        col("id") >= NumCentroids && col("id") < NumCentroids + 4,
        col("id") < NumCentroids, s2)
      Similarity.forgetFromIvfPqStore(spark, s2,
        emb.filter(col("vec_id") % 17 === 3).select("vec_id"))
    }
    time("e29_admit_only") { () =>
      val s3 = graft.queries.Dsl.tempStore("attrib_admit")
      Similarity.buildIvfPqStore(
        emb.filter(col("vec_id") % 11 =!= 5), "vec_id", "embedding",
        col("id") >= NumCentroids && col("id") < NumCentroids + 4,
        col("id") < NumCentroids, s3)
      Similarity.admitIvfPqBatch(spark, s3,
        emb.filter(col("vec_id") % 11 === 5), "vec_id", "embedding", 1L)
    }

    // --- g04 stages ---
    import org.apache.spark.storage.StorageLevel
    val edges = Tables.events(spark, sfDir).select(
      col("user_id").as("src"),
      (regexp_extract(col("props"), "[0-9]+", 0).cast("long") % 150).as("dst"))
    time("g04_und_distinct") { () =>
      fc(edges.filter(col("src") =!= col("dst"))
        .select(least(col("src"), col("dst")).as("u"),
          greatest(col("src"), col("dst")).as("v")).distinct())
    }
    time("g04_full_from_oe") { () =>
      val und = edges.filter(col("src") =!= col("dst"))
        .select(least(col("src"), col("dst")).as("u"),
          greatest(col("src"), col("dst")).as("v"))
        .distinct().persist(StorageLevel.MEMORY_AND_DISK)
      val deg = und.select(col("u").as("node"))
        .union(und.select(col("v").as("node")))
        .groupBy("node").agg(count(lit(1)).as("deg"))
      val o = und
        .join(deg.select(col("node").as("u"), (col("deg") * 1000000 + col("u")).as("ou")), "u")
        .join(deg.select(col("node").as("v"), (col("deg") * 1000000 + col("v")).as("ov")), "v")
      val oe = o.select(
        when(col("ou") < col("ov"), col("u")).otherwise(col("v")).as("a"),
        when(col("ou") < col("ov"), col("v")).otherwise(col("u")).as("b"),
        greatest(col("ou"), col("ov")).as("ob"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      oe.count()
      val t0 = System.nanoTime()
      val sources = oe.select(col("a").as("y")).distinct()
      val e1 = oe.select(col("a"), col("b").as("y"), col("ob").as("ob1"))
        .join(sources, Seq("y"), "leftsemi")
      val e2 = oe.select(col("a"), col("b").as("z"), col("ob").as("ob2"))
      val wedges = e1.join(e2, Seq("a")).filter(col("ob1") < col("ob2"))
      val closing = oe.select(col("a").as("y"), col("b").as("z"))
      val tri = wedges.join(closing, Seq("y", "z"))
        .select(col("a").as("x"), col("y"), col("z"))
      fc(tri.select(col("x").as("node"))
        .union(tri.select(col("y").as("node")))
        .union(tri.select(col("z").as("node")))
        .groupBy("node").agg(count(lit(1)).as("n_tri")))
      println(f"[attrib]   g04 wedge+close leg alone: ${(System.nanoTime() - t0) / 1e9}%.3f")
      und.unpersist(); oe.unpersist()
    }

    // --- streaming fixed overhead: 3-batch no-op foreachBatch ---
    time("stream_3batch_noop") { () =>
      import spark.implicits._
      implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Long]
      val q = mem.toDF().writeStream
        .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          b.count(); ()
        }
        .start()
      try (1 to 3).foreach { i => mem.addData(i.toLong); q.processAllAvailable() }
      finally q.stop()
    }

    spark.stop()
  }
}
