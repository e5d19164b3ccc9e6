package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Scratch measurement harness for the optimization rounds: times named
  * experiments (GRAFT_OPT=a,b,c) against sf0.1 with the bench's protocol
  * (noop sink, 1 warmup + 3 timed, median). Not part of the driver
  * surface — numbers of record come from graft.Bench. */
object OptProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val which = (if (args.nonEmpty) args(0)
                 else sys.env.getOrElse("GRAFT_OPT", "q1")).split(",").toSet
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.sql.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def t(name: String): DataFrame = Tables.table(spark, sfDir, name)
    def once(df: => DataFrame): Double = {
      val t0 = System.nanoTime()
      df.write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }
    def med3(tag: String)(df: => DataFrame): Unit = {
      once(df)
      val ts = Seq.fill(3)(once(df)).sorted
      println(f"[opt] $tag%-40s median=${ts(1)}%.3f all=${ts.map(x => f"$x%.3f")}")
    }

    def dumpPlan(df: DataFrame, path: String): Unit = {
      val w = new java.io.PrintWriter(path)
      try w.println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
      finally w.close()
    }

    if (which("q1plans")) {
      val li = t("lineitem")
      def exactSumOld(c: org.apache.spark.sql.Column) =
        sum(round(c, 6).cast(DecimalType(28, 6))).cast(DoubleType)
      val q1Old = li
        .filter(col("l_shipdate") <= lit("2000-12-01").cast(TimestampType))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(round(col("l_quantity"), 6).cast(DecimalType(28, 6))), 2).cast(DoubleType).as("sum_qty"),
          round(sum(round(col("l_extendedprice"), 6).cast(DecimalType(28, 6))), 2).cast(DoubleType).as("sum_base_price"),
          round(sum(round(col("l_extendedprice") * (lit(1) - col("l_discount")), 6).cast(DecimalType(28, 6))), 2).cast(DoubleType).as("sum_disc_price"),
          round(exactSumOld(col("l_quantity")) / count(lit(1)), 6).as("avg_qty"),
          round(exactSumOld(col("l_discount")) / count(lit(1)), 6).as("avg_disc"),
          count(lit(1)).as("count_order"))
      dumpPlan(q1Old, "plans/r10/q1_pricing_summary_before.txt")
      dumpPlan(SparkEntry.queries("q1_pricing_summary")(spark, sfDir),
        "plans/r10/q1_pricing_summary_after.txt")
      val cust = t("customer").filter(col("c_mktsegment") === "BUILDING")
      val ord = t("orders")
        .filter(col("o_orderdate") < lit("1997-01-01").cast(TimestampType))
      val keyset = broadcast(cust)
        .join(ord, col("c_custkey") === col("o_custkey"))
        .select(col("o_orderkey"))
      val liAgg = li
        .filter(col("l_shipdate") > lit("1997-01-01").cast(TimestampType))
        .groupBy(col("l_orderkey"))
        .agg(round(sum(round(col("l_extendedprice") * (lit(1) - col("l_discount")), 6)
          .cast(DecimalType(28, 6))), 2).cast(DoubleType).as("revenue"))
        .filter(col("revenue") > 100000)
      val q3Old = liAgg.join(broadcast(keyset), col("l_orderkey") === col("o_orderkey"))
        .select(col("o_orderkey"), col("revenue"))
      dumpPlan(q3Old, "plans/r10/q3_segment_revenue_before.txt")
      dumpPlan(SparkEntry.queries("q3_segment_revenue")(spark, sfDir),
        "plans/r10/q3_segment_revenue_after.txt")
    }

    if (which("bm25")) {
      val docs = t("documents")
      val nQ = 20L
      val docs10 = (0 until 10).map(i => docs
          .withColumn("doc_id", col("doc_id") + lit(i * 100000000L))
          .withColumn("text", concat(col("text"), lit(s" r$i"))))
        .reduce(_ unionByName _).coalesce(32).cache()
      println("[opt] bm25 docs=" + docs10.count())
      val queries = docs.filter(col("doc_id") < nQ)
        .select(col("doc_id").as("qid"), col("text"))
      med3("bm25_topk_full")(llm.RetrievalOps.bm25TopK(
        docs10, "doc_id", "text", queries, "qid", "text", k = 10))
      // stage: the one-row stats aggregate (tokenize pass #1)
      val toks = filter(split(lower(trim(col("text"))), "[ \\t\\n\\r\\f]+"),
        x => length(x) > 0)
      med3("bm25_stats_only")(docs10.agg(
        count(lit(1)).as("_n"),
        coalesce(avg(size(toks)), lit(0.0)).as("_avgdl")))
      // stage: the TokenTfEntries scan + qvocab broadcast join (pass #2)
      val entries = org.apache.spark.sql.GraftExpressionBridge.column(
        graft.functions.TokenTfEntries(
          org.apache.spark.sql.GraftExpressionBridge.expression(
            lower(trim(col("text"))))))
      val qv = queries.select(explode(filter(split(lower(trim(col("text"))),
        "[ \\t\\n\\r\\f]+"), x => length(x) > 0)).as("_term")).distinct()
      med3("bm25_tf_scan_only")(docs10
        .select(col("doc_id").as("_doc"), entries.as("_e"))
        .withColumn("_dl", aggregate(col("_e"), lit(0L),
          (a, e) => a + e.getField("tf").cast("long")))
        .select(col("_doc"), col("_dl"), explode(col("_e")).as("_te"))
        .select(col("_doc"), col("_te.term").as("_term"),
          col("_te.tf").cast("long").as("_tf"), col("_dl"))
        .join(broadcast(qv), Seq("_term")))
      val idxDir = java.nio.file.Files.createTempDirectory("graft_opt_bm25").toString
      llm.RetrievalOps.bm25BuildIndex(docs10, "doc_id", "text", idxDir, nTermBuckets = 64)
      med3("bm25_index_query")(llm.RetrievalOps.bm25QueryIndex(
        spark, idxDir, queries, "qid", "text", k = 10))
      med3("bm25_postings_scan")(spark.read.parquet(s"$idxDir/postings"))
      dumpPlan(llm.RetrievalOps.bm25TopKUnpinned(docs10, "doc_id", "text",
        queries, "qid", "text", k = 10), "plans/r10/bm25_topk_after.txt")
      // the r9 scoring chain (3 broadcast probes per hit row) — before-plan
      locally {
        val qterms = queries.select(col("qid").as("_qid"),
            explode(filter(split(lower(trim(col("text"))), "[ \\t\\n\\r\\f]+"),
              x => length(x) > 0)).as("_term")).distinct()
        val qvb = qterms.select(col("_term")).distinct()
        val stats = docs10.agg(count(lit(1)).as("_n"),
          coalesce(avg(size(filter(split(lower(trim(col("text"))), "[ \\t\\n\\r\\f]+"),
            x => length(x) > 0))), lit(0.0)).as("_avgdl"))
        val tf = docs10
          .select(col("doc_id").as("_doc"), entries.as("_e"))
          .withColumn("_dl", aggregate(col("_e"), lit(0L),
            (a, e) => a + e.getField("tf").cast("long")))
          .select(col("_doc"), col("_dl"), explode(col("_e")).as("_te"))
          .select(col("_doc"), col("_te.term").as("_term"),
            col("_te.tf").cast("long").as("_tf"), col("_dl"))
          .join(broadcast(qvb), Seq("_term"))
        val dfreq = tf.groupBy(col("_term")).agg(count(lit(1)).as("_df"))
        val scored = tf.join(broadcast(dfreq), Seq("_term"))
          .crossJoin(broadcast(stats))
          .withColumn("_idf", log(lit(1.0) +
            (col("_n") - col("_df") + lit(0.5)) / (col("_df") + lit(0.5))))
          .withColumn("_w", col("_idf") * (col("_tf") * lit(2.2)) /
            (col("_tf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("_dl") / col("_avgdl"))))
        val perQuery = scored.join(broadcast(qterms), Seq("_term"))
          .groupBy(col("_qid"), col("_doc"))
          .agg(round(sum(col("_w")), 6).as("_score"))
        dumpPlan(perQuery, "plans/r10/bm25_topk_before.txt")
        med3("bm25_before_chain")(perQuery)
      }
      dumpPlan(llm.RetrievalOps.bm25QueryIndex(spark, idxDir, queries,
        "qid", "text", k = 10), "plans/r10/bm25_index_topk_after.txt")
      docs10.unpersist()
    }

    if (which("ivfprobe")) {
      val emb1 = t("embeddings")
      val emb10 = (0 until 10).map(i =>
          emb1.withColumn("vec_id", col("vec_id") + lit(i * 100000000L)))
        .reduce(_ unionByName _).coalesce(32).cache()
      emb10.count()
      val centroids10 = llm.SimilarityOps.ivfTrain(emb10, "vec_id", "embedding", 32)
      val assigned10 = llm.SimilarityOps.ivfAssign(emb10, "vec_id", "embedding", centroids10)
        .localCheckpoint(true)
      med3("ivf_probe_20q")(llm.SimilarityOps.ivfProbeLists(assigned10,
        emb1.filter(col("vec_id") < 20), "vec_id", "embedding", k = 10,
        nProbe = 8, centroids10, emb1.schema("vec_id").dataType))
      emb10.unpersist()
    }

    if (which("minhash")) {
      val docs = t("documents")
      val docs10 = (0 until 10).map(i => docs
          .withColumn("doc_id", col("doc_id") + lit(i * 100000000L))
          .withColumn("text", concat(col("text"), lit(s" r$i"))))
        .reduce(_ unionByName _).coalesce(32).cache()
      println("[opt] minhash docs=" + docs10.count())
      med3("minhash_pairs")(llm.TextOps.minHashLshPairs(docs10, "doc_id", "text"))
      docs10.unpersist()
    }

    if (which("mhlanes")) {
      // r11: dedup_minhash is compute-bound in the 64-lane signature fold —
      // time the fold variants DIRECTLY on real corpus text (driver-side
      // loop; the op spends its wall in exactly this kernel), asserting
      // per-document bit-equality as we go.
      import org.apache.spark.unsafe.types.UTF8String
      val texts = t("documents").select(col("text")).collect()
        .map(r => UTF8String.fromString(r.getString(0)))
      println(s"[opt] mhlanes docs=${texts.length}")
      // (r11 A/B already landed: the production fold is the 4-way-unrolled
      // winner — current 0.209/0.245 s vs unrolled 0.190 vs by-lane 0.189
      // per 5k-doc sweep, bit-equality asserted across every document
      // before the swap. This probe now times the production fold only.)
      def kbench(tag: String)(f: UTF8String => Array[Long]): Unit = {
        var sink = 0L
        (0 until 2).foreach(_ => texts.foreach { s =>
          val a = f(s); if (a.nonEmpty) sink ^= a(0) })
        val runs = (0 until 5).map { _ =>
          val t0 = System.nanoTime()
          texts.foreach { s => val a = f(s); if (a.nonEmpty) sink ^= a(0) }
          (System.nanoTime() - t0) / 1e9
        }.sorted
        println(f"[opt] $tag%-30s median=${runs(2)}%.3f all=${runs.map(x => f"$x%.3f")} sink=$sink")
      }
      kbench("mh_production")(s => graft.functions.MinHashSignature.signatureCurrent(s, 64, 5))
    }

    if (which("fc")) {
      // r11: bisect fc_autoets_users (the largest main-section item) into
      // input-prep (userSeries agg) / gather / kernel stages
      val ev = t("events")
      val us = ev.groupBy(col("user_id").as("g"), col("ts").cast(DateType).as("ds"))
        .agg(sum("value").as("y"))
      println("[opt] fc series=" + us.select(col("g")).distinct().count())
      med3("fc_userseries_only")(us)
      med3("fc_gather_only")(ops.Series.gather(us, "g", "ds", "y"))
      med3("fc_snaive_full")(ops.TsForecastOp.forecastBy(us, "g", "ds", "y",
        "SeasonalNaive", 14, "1d", Map("seasonal_period" -> "7")))
      med3("fc_autoets_full")(ops.TsForecastOp.forecastBy(us, "g", "ds", "y",
        "AutoETS", 14, "1d", Map("seasonal_period" -> "7")))
      // kernel-only: the gather output pinned, so the timed run pays just
      // kernel UDF + explode + projection
      val gPin = llm.Pin(ops.Series.gather(us, "g", "ds", "y"))
      println("[opt] fc gather partitions=" + gPin.df.rdd.getNumPartitions)
      val opts = graft.kernels.Forecast.optionsFromParams("AutoETS", 14,
        Map("seasonal_period" -> "7"))
      val fcU = udf((ts: Seq[Long], vs: Seq[Double], nu: Seq[Boolean]) => {
        try {
          val outk = graft.kernels.Forecast.forecast(vs.toArray, nu.map(!_).toArray, opts)
          Some((0 until outk.point.length).map(i =>
            (i + 1, outk.point(i), outk.lower(i), outk.upper(i), outk.modelName)))
        } catch { case _: graft.kernels.Forecast.InsufficientData |
                       _: graft.kernels.Forecast.ComputationError => None }
      })
      med3("fc_autoets_kernel_only")(gPin.df
        .select(col("g"), explode(fcU(col("_ts"), col("_vs"), col("_nu"))).as("_r"))
        .select(col("g"), col("_r._1").as("step"), col("_r._2").as("yhat"),
          col("_r._3").as("lo"), col("_r._4").as("hi"), col("_r._5").as("model")))
      // pure-kernel sweep over EVERY series, single driver thread: total
      // kernel CPU vs the Spark wall, and the per-series skew (a handful of
      // slow series = one straggler partition owns the stage)
      locally {
        val sample = gPin.df.collect()
        def sweepAll(): Array[Double] = sample.map { r =>
          val vs = r.getSeq[Double](2).toArray
          val valid = r.getSeq[Boolean](3).map(!_).toArray
          val t0 = System.nanoTime()
          try graft.kernels.Forecast.forecast(vs, valid, opts)
          catch { case _: Throwable => () }
          (System.nanoTime() - t0) / 1e6
        }
        sweepAll(); sweepAll() // JIT warmup
        val ms = sweepAll()
        val obs = sample.map(_.getSeq[Double](2).length)
        val order = ms.zip(obs).sortBy(-_._1)
        println(f"[opt] fc_autoets_driver_kernel n=${sample.length} total_ms=${ms.sum}%.1f " +
          f"mean_ms=${ms.sum / ms.length}%.3f max_ms=${ms.max}%.2f " +
          f"top5=${order.take(5).map { case (m, o) => f"$m%.1fms@${o}obs" }.mkString(",")} " +
          f"obs[min=${obs.min},max=${obs.max}]")
      }
      gPin.release()
    }

    if (which("spans")) {
      // r11: bisect dedup_spans_docs (never examined in an optimization
      // pass): window generation vs repeated-gram agg vs coverage agg
      val docs = t("documents")
      val docsSpan10 = (0 until 10).map(i => docs
          .withColumn("doc_id", col("doc_id") + lit(i * 100000000L))
          .withColumn("text", translate(col("text"), "eE", s"$i$i")))
        .reduce(_ unionByName _).coalesce(32).cache()
      println("[opt] spans docs=" + docsSpan10.count())
      med3("spans_full")(llm.TextOps.removeDuplicatedSpans(docsSpan10,
        "doc_id", "text", gramLen = 20))
      val B = org.apache.spark.sql.GraftExpressionBridge
      val wg = B.column(graft.functions.WordGrams(
        B.expression(col("text")), 20, false, true))
      val occ = docsSpan10
        .select(col("doc_id"), posexplode(wg))
        .withColumnRenamed("pos", "_p")
        .select(col("doc_id"), col("_p"), xxhash64(col("col")).as("_gh"))
      med3("spans_occ_only")(occ)
      val repeated = occ.groupBy(col("_gh"))
        .agg(min(struct(col("doc_id"), col("_p"))).as("_first"),
          count(lit(1)).as("_cnt"))
        .filter(col("_cnt") >= 2)
      med3("spans_repeated_only")(repeated)
      val dups = occ.join(repeated, Seq("_gh"))
        .filter(struct(col("doc_id"), col("_p")) =!= col("_first"))
      val covered = dups
        .select(col("doc_id"), explode(sequence(col("_p"), col("_p") + 19)).as("_idx"))
        .groupBy(col("doc_id"))
        .agg(sort_array(collect_set(col("_idx").cast("long"))).as("_cov"))
      med3("spans_covered_only")(covered)
      docsSpan10.unpersist()
    }

    if (which("funnel")) {
      // r11: funnel_events at 10× — m chained entity-keyed aggs/joins; A/B
      // a single up-front repartition(keys) all downstream stages share
      // (guide §2.4: operations keyed the same way share one exchange)
      val ev1 = t("events")
      val ev10 = (0 until 10).map(i =>
          ev1.withColumn("user_id", col("user_id") + lit(i * 100000000L)))
        .reduce(_ unionByName _).coalesce(32).cache()
      println("[opt] funnel events=" + ev10.count())
      val steps = Seq("view", "click", "purchase")
      val win = Some(7L * 86400L * 1000000L)
      med3("funnel_full_shipped")(ops.CohortOps.funnelCounts(ev10,
        Seq("user_id"), "ts", "event_type", steps, win))
      // shipped funnel() stage bisect: the anchor agg alone
      med3("funnel_anchor_only")(ev10
        .filter(col("ts").isNotNull && col("event_type").isin(steps.map(lit): _*))
        .filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(unix_micros(col("ts").cast("timestamp"))).as("t1")))
      // candidate: one shared repartition — replicate funnel() inline with
      // e pre-partitioned on the entity key
      locally {
        val e = ev10
          .filter(col("ts").isNotNull && col("event_type").isin(steps.map(lit): _*))
          .select(col("user_id"), col("event_type").as("__s"),
            unix_micros(col("ts").cast("timestamp")).as("__t"))
          .repartition(col("user_id"))
        var acc = e.filter(col("__s") === steps.head)
          .groupBy(col("user_id")).agg(min(col("__t")).as("t1"))
        var i = 2
        while (i <= steps.length) {
          val prev = s"t${i - 1}"
          val stepEvents = e.filter(col("__s") === steps(i - 1))
          val gate = win.map(w => col("__t") <= col("t1") + lit(w)).getOrElse(lit(true))
          val next = acc.join(stepEvents, Seq("user_id"), "inner")
            .filter(col("__t") >= col(prev) && gate)
            .groupBy(col("user_id")).agg(min(col("__t")).as(s"t$i"))
          acc = acc.join(next, Seq("user_id"), "left")
          i += 1
        }
        val perStep = (1 to steps.length).map(j =>
          sum(when(col(s"t$j").isNotNull, 1L).otherwise(0L)).as(s"n$j"))
        val totals = acc.agg(perStep.head, perStep.tail: _*)
        val counts = totals.select(
            posexplode(array((1 to steps.length).map(j => col(s"n$j")): _*))
              .as(Seq("__i", "n_entities")))
          .select((col("__i") + 1).cast("long").as("step_idx"),
            element_at(array(steps.map(lit): _*), col("__i") + 1).as("step"),
            col("n_entities"))
        med3("funnel_shared_repart")(counts)
        counts.collect().foreach(r => println("[opt] funnel_repart row " + r))
      }
      ops.CohortOps.funnelCounts(ev10, Seq("user_id"), "ts", "event_type",
        steps, win).collect().foreach(r => println("[opt] funnel_shipped row " + r))
      ev10.unpersist()
    }

    if (which("mh2")) {
      // r11: the driver-side fold sweep (mhlanes) proved the signature fold
      // is only ~2.1 s single-thread for the WHOLE 10× corpus (~65 ms over
      // 32 cores) — so dedup_minhash_docs' 3.2 s is NOT the fold. Bisect
      // the op: banded table (signature+banding scan) vs bucket aggregate
      // vs pair explode+distinct.
      val docs = t("documents")
      val docs10 = (0 until 10).map(i => docs
          .withColumn("doc_id", col("doc_id") + lit(i * 100000000L))
          .withColumn("text", concat(col("text"), lit(s" r$i"))))
        .reduce(_ unionByName _).coalesce(32).cache()
      println("[opt] mh2 docs=" + docs10.count())
      val B = org.apache.spark.sql.GraftExpressionBridge
      val banded = llm.TextOps.bandedTable(docs10, "doc_id", "text", 64, 16, 5)
      med3("mh2_banded_only")(banded)
      val buckets = banded.groupBy(col("band"), col("bucket"))
        .agg(B.column(graft.functions.BoundedIdSet(
          B.expression(col("doc_id")), 1000).toAggregateExpression()).as("_ids"))
        .filter(size(col("_ids")) >= 2)
      med3("mh2_buckets_only")(buckets)
      println("[opt] mh2 nonsingleton buckets=" + buckets.count())
      val pairStructs = flatten(transform(col("_ids"), (a, i) =>
        transform(slice(col("_ids"), i + 2, size(col("_ids"))),
          bb => struct(a.as("id_a"), bb.as("id_b")))))
      val prePairs = buckets.select(explode(pairStructs).as("_p"))
        .select(col("_p.id_a").as("id_a"), col("_p.id_b").as("id_b"))
      med3("mh2_pairs_nodistinct")(prePairs)
      println("[opt] mh2 pairs pre-distinct=" + prePairs.count())
      med3("mh2_full")(llm.TextOps.minHashLshPairs(docs10, "doc_id", "text"))
      println("[opt] mh2 pairs distinct=" +
        llm.TextOps.minHashLshPairs(docs10, "doc_id", "text").count())
      docs10.unpersist()
    }

    if (which("dedupagainst")) {
      val docs = t("documents")
      val docs10 = (0 until 10).map(i => docs
          .withColumn("doc_id", col("doc_id") + lit(i * 100000000L))
          .withColumn("text", concat(col("text"), lit(s" r$i"))))
        .reduce(_ unionByName _).coalesce(32).cache()
      docs10.count()
      val ref = docs10.filter(col("doc_id") >= 100000000L)
      val inc = docs10.filter(col("doc_id") < 100000000L)
      val idx = llm.TextOps.buildDedupIndex(ref, "doc_id", "text", threshold = 0.9)
      med3("da_full")(llm.TextOps.dedupAgainstIndex(inc, idx, "doc_id", "text",
        threshold = 0.9))
      med3("da_candidates_only")(llm.TextOps.crossCorpusCandidatesWithIndex(
        inc, idx, "doc_id", "text"))
      dumpPlan(llm.TextOps.dedupAgainstIndex(inc, idx, "doc_id", "text",
        threshold = 0.9), "plans/r10/dedup_against_after.txt")
      // the r9 chain: per-batch ref-side histogram + ref-side shuffles
      locally {
        val inB = llm.TextOps.bandedTable(inc, "doc_id", "text",
            idx.numHashes, idx.bands, idx.shingleSize)
          .select(col("doc_id").as("id_in"), col("band"), col("bucket"))
        val refB = idx.banded
        val okBuckets = inB.groupBy(col("band"), col("bucket")).agg(count(lit(1)).as("_ni"))
          .join(refB.groupBy(col("band"), col("bucket")).agg(count(lit(1)).as("_nr")),
            Seq("band", "bucket"))
          .filter(col("_ni") + col("_nr") <= 1000)
          .select(col("band"), col("bucket"))
        val pairs = inB.join(okBuckets, Seq("band", "bucket"))
          .join(refB, Seq("band", "bucket"))
          .select(col("id_in"), col("id_ref"))
          .distinct()
        val shIn = inc.select(col("doc_id").as("id_in"),
          llm.TextOps.shingleHashSetCol(col("text"), idx.shingleSize).as("_sh_in"))
        val dupIds = pairs
          .join(shIn, Seq("id_in")).join(idx.shingleSets, Seq("id_ref"))
          .withColumn("_j", llm.TextOps.hashSetJaccard(col("_sh_in"), col("_sh_ref")))
          .filter(col("_j") >= 0.9)
          .select(col("id_in").as("doc_id")).distinct()
        dumpPlan(inc.join(dupIds, Seq("doc_id"), "left_anti"),
          "plans/r10/dedup_against_before.txt")
      }
      println("[opt] cand rows=" + llm.TextOps.crossCorpusCandidatesWithIndex(
        inc, idx, "doc_id", "text").count())
      idx.release()
      docs10.unpersist()
    }

    if (which("lm")) {
      val docs = t("documents")
      val docs10 = (0 until 10).map(i => docs
          .withColumn("doc_id", col("doc_id") + lit(i * 100000000L))
          .withColumn("text", concat(col("text"), lit(s" r$i"))))
        .reduce(_ unionByName _).coalesce(32).cache()
      println("[opt] lm docs=" + docs10.count())
      med3("lm_bigram_full")(llm.TextOps.bigramPerplexity(docs10, "doc_id", "text",
        vocabSize = 65536, bigramVocabSize = 1 << 20))
      val model = llm.TextOps.trainBigramLm(docs10, "text",
        vocabSize = 65536, bigramVocabSize = 1 << 20)
      med3("lm_train_vocab_only")(model.vocab)
      med3("lm_train_bigrams_only")(model.bigrams)
      val pinned = llm.TextOps.BigramLmModel(
        llm.Pin(model.vocab).df, llm.Pin(model.bigrams).df,
        llm.Pin(model.totals).df, 65536, 0.5, 0.75)
      med3("lm_score_only")(llm.TextOps.bigramScoreWithModel(
        docs10, "doc_id", "text", pinned))
      dumpPlan(llm.TextOps.bigramPerplexity(docs10, "doc_id", "text",
        vocabSize = 65536, bigramVocabSize = 1 << 20),
        "plans/r10/lm_bigram_after.txt")
      // broadcast-scorer A/B: per-token BigDecimal chain (r9) vs the
      // RoundedDecimal.scaledLong guard-banded fast path
      med3("lm_score_broadcast")(llm.TextOps.bigramScoreBroadcast(
        docs10, "text", pinned))
      locally {
        val vocabMap = pinned.vocab.collect()
          .map(r => r.getString(0) -> r.getLong(1)).toMap
        val bigramMap = pinned.bigrams.collect()
          .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
        val n = pinned.totals.collect()(0).getLong(0)
        val denom = n + pinned.alpha * (pinned.vocabSize + 1)
        val alpha = pinned.alpha; val lambda = pinned.lambda
        val bcV = spark.sparkContext.broadcast(vocabMap)
        val bcB = spark.sparkContext.broadcast(bigramMap)
        val oldUdf = udf((toks: Seq[String]) => {
          var s = 0L; var i = 0
          while (i < toks.length) {
            val w2 = toks(i)
            val cw = bcV.value.getOrElse(w2, 0L)
            val puni = (cw + alpha) / denom
            val cwp = if (i == 0) None else bcV.value.get(toks(i - 1))
            val lp = cwp match {
              case None => math.log(puni)
              case Some(c1) =>
                val pbi = bcB.value.get((toks(i - 1), w2)) match {
                  case Some(c2) => c2.toDouble / c1.toDouble
                  case None => 0.0
                }
                math.log(lambda * pbi + (1.0 - lambda) * puni)
            }
            s += java.math.BigDecimal.valueOf(lp)
              .setScale(6, java.math.RoundingMode.HALF_UP)
              .movePointRight(6).longValueExact()
            i += 1
          }
          new java.math.BigDecimal(java.math.BigInteger.valueOf(s), 6).doubleValue()
        })
        val toksC = filter(split(trim(coalesce(col("text"), lit(""))),
          "[ \\t\\n\\r\\f]+"), tt => length(tt) > 0)
        med3("lm_score_broadcast_r9udf")(docs10
          .withColumn("_toks", toksC)
          .withColumn("n_tokens", size(col("_toks")).cast("long"))
          .withColumn("sum_logp", oldUdf(col("_toks")))
          .drop("_toks"))
      }
      docs10.unpersist()
    }

    if (which("knn")) {
      val emb1 = t("embeddings")
      val n1 = emb1.count()
      val emb10 = (0 until 10).map(i =>
          emb1.withColumn("vec_id", col("vec_id") + lit(i * 100000000L)))
        .reduce(_ unionByName _).coalesce(32).cache()
      emb10.count()
      val centroids10 = llm.SimilarityOps.ivfTrain(emb10, "vec_id", "embedding", 32)
      println("[opt] knn vectors=" + (n1 * 10) + " dim=" +
        emb1.select(size(col("embedding"))).collect()(0).getInt(0))
      med3("knn_assign_only")(llm.SimilarityOps.ivfAssign(emb10, "vec_id", "embedding", centroids10))
      med3("knn_probesel_only")(llm.SimilarityOps.probeSelection(emb10, "vec_id", "embedding", 8, centroids10))
      med3("knn_full")(llm.SimilarityOps.knnGraphWithCentroids(
        emb10, "vec_id", "embedding", k = 10, centroids10, nProbe = 8))
      dumpPlan(llm.SimilarityOps.knnGraphWithCentroids(
        emb10, "vec_id", "embedding", k = 10, centroids10, nProbe = 8),
        "plans/r10/knn_graph_after.txt")
      // stage bisection of the probe join
      val B = org.apache.spark.sql.GraftExpressionBridge
      def chunkTopK(qid: org.apache.spark.sql.Column, qv: org.apache.spark.sql.Column,
                    ids: org.apache.spark.sql.Column, norms: org.apache.spark.sql.Column,
                    vecsFlat: org.apache.spark.sql.Column, lens: org.apache.spark.sql.Column) =
        B.column(graft.functions.ChunkTopK(B.expression(qid), B.expression(qv),
          B.expression(ids), B.expression(norms), B.expression(vecsFlat),
          B.expression(lens), 10, true))
      val assigned = llm.SimilarityOps.ivfAssign(emb10, "vec_id", "embedding", centroids10)
      val hist = assigned.groupBy(col("centroid_id")).agg(count(lit(1)).as("_ln"))
      val packed = assigned
        .filter(col("_cv").isNotNull)
        .withColumn("_vl", col("vid").cast("long"))
        .join(broadcast(hist), Seq("centroid_id"))
        .withColumn("_chunk", llm.SampleOps.hashBucket(col("_vl"), 0xc4a11L) %
          ceil(col("_ln").cast("double") / 1024).cast("long"))
        .groupBy(col("centroid_id"), col("_chunk"))
        .agg(collect_list(struct(col("_vl").as("vid"),
          sqrt(llm.SimilarityOps.dot(col("_cv"), col("_cv"))).as("nrm"),
          col("_cv").as("vec"))).as("_pk"))
        .select(col("centroid_id"), col("_pk.vid").as("_pids"),
          col("_pk.nrm").as("_pnrms"), flatten(col("_pk.vec")).as("_pflat"),
          transform(col("_pk.vec"), v => size(v)).as("_plens"))
      med3("knn_pack_only")(packed)
      val probes = llm.SimilarityOps.probeSelection(emb10, "vec_id", "embedding", 8, centroids10)
      val exploded = probes.join(packed, Seq("centroid_id"))
        .select(col("qid"), explode(chunkTopK(col("qid").cast("long"), col("_qv"),
          col("_pids"), col("_pnrms"), col("_pflat"), col("_plens"))).as("_h"))
        .select(col("qid"), col("_h.vid").as("vid"), col("_h.sim").as("sim"))
      med3("knn_join_chunk_only")(exploded)
      emb10.unpersist()
    }

    if (which("fzprefix")) {
      // prefix-selection A/B: V0 = shipped (join gramDf -> window -> rejoin
      // slim for the string), V1 = carry the string through the gram rows
      // (drops the slim re-join at the cost of ~24 B extra per gram row on
      // the gh and id exchanges)
      val docs = t("documents")
      val docsM = (0 until 10).map(i => docs
          .withColumn("doc_id", col("doc_id") + lit(i * 100000000L))
          .withColumn("text", translate(col("text"), "eE", s"$i$i")))
        .reduce(_ unionByName _).coalesce(32)
        .select(col("doc_id").as("id"), substring(col("text"), 1, 24).as("s"))
        .cache()
      println("[opt] fzprefix strings=" + docsM.count())
      val d = 2; val q = 3
      val slim = docsM
        .filter(col("s").isNotNull && length(col("s")) > 0)
        .select(col("id").cast("long").as("id"), col("s"),
          length(col("s")).as("len"))
      val wRank = org.apache.spark.sql.expressions.Window
        .partitionBy("id").orderBy(col("__df").asc, col("gh").asc)
      locally {
        val grams = slim.select(col("id"), col("len"),
          posexplode(
            when(col("len") >= q,
              transform(sequence(lit(0), col("len") - lit(q)),
                i => xxhash64(col("s").substr(i + lit(1), lit(q)))))
              .otherwise(array().cast("array<bigint>"))).as(Seq("pos", "gh")))
        val gramDf = grams.groupBy("gh").agg(count(lit(1)).as("__df"))
        val v0 = grams.join(gramDf, "gh")
          .withColumn("__vr", dense_rank().over(wRank))
          .filter(col("__vr") <= d * q + 1)
          .join(slim.select(col("id"), col("s")), Seq("id"))
          .select(col("id"), col("len"), col("pos"), col("gh"), col("s"))
        med3("fzprefix_v0_shipped")(v0)
        println("[opt] v0 rows=" + v0.count())
      }
      locally {
        val grams = slim.select(col("id"), col("len"), col("s"),
          posexplode(
            when(col("len") >= q,
              transform(sequence(lit(0), col("len") - lit(q)),
                i => xxhash64(col("s").substr(i + lit(1), lit(q)))))
              .otherwise(array().cast("array<bigint>"))).as(Seq("pos", "gh")))
        val gramDf = grams.groupBy("gh").agg(count(lit(1)).as("__df"))
        val v1 = grams.join(gramDf, "gh")
          .withColumn("__vr", dense_rank().over(wRank))
          .filter(col("__vr") <= d * q + 1)
          .select(col("id"), col("len"), col("pos"), col("gh"), col("s"))
        med3("fzprefix_v1_carry_s")(v1)
        println("[opt] v1 rows=" + v1.count())
        println("[opt] v1 plan windowgrouplimit=" +
          v1.queryExecution.executedPlan.toString.contains("WindowGroupLimit"))
      }
      docsM.unpersist()
    }

    if (which("fuzzyplan")) {
      // regenerate the committed plan artifact only (no timings)
      val docs = t("documents")
      val docsM = (0 until 10).map(i => docs
          .withColumn("doc_id", col("doc_id") + lit(i * 100000000L))
          .withColumn("text", translate(col("text"), "eE", s"$i$i")))
        .reduce(_ unionByName _).coalesce(32)
        .select(col("doc_id").as("id"), substring(col("text"), 1, 24).as("s"))
      dumpPlan(llm.FuzzyJoinOps.fuzzySelfJoin(docsM, "id", "s", 2),
        "plans/r10/fuzzy_join_pairs_after.txt")
      println("[opt] fuzzy plan dumped")
    }

    if (which("fuzzy")) {
      // the bench fixture: 10× replica-distinct 24-char prefixes
      val docs = t("documents")
      val docsM = (0 until 10).map(i => docs
          .withColumn("doc_id", col("doc_id") + lit(i * 100000000L))
          .withColumn("text", translate(col("text"), "eE", s"$i$i")))
        .reduce(_ unionByName _).coalesce(32)
        .select(col("doc_id").as("id"), substring(col("text"), 1, 24).as("s"))
        .cache()
      println("[opt] fuzzy strings=" + docsM.count())
      val d = 2; val q = 3
      val slim = docsM
        .filter(col("s").isNotNull && length(col("s")) > 0)
        .select(col("id").cast("long").as("id"), col("s"),
          length(col("s")).as("len"))
      val grams = slim.select(col("id"), col("len"),
        posexplode(
          when(col("len") >= q,
            transform(sequence(lit(0), col("len") - lit(q)),
              i => xxhash64(col("s").substr(i + lit(1), lit(q)))))
            .otherwise(array().cast("array<bigint>"))).as(Seq("pos", "gh")))
      med3("fz_grams_only")(grams)
      med3("fz_gramdf")(grams.groupBy("gh").agg(count(lit(1)).as("__df")))
      val gramDf = grams.groupBy("gh").agg(count(lit(1)).as("__df"))
      val wRank = org.apache.spark.sql.expressions.Window
        .partitionBy("id").orderBy(col("__df").asc, col("gh").asc)
      val prefix = grams.join(gramDf, "gh")
        .withColumn("__vr", dense_rank().over(wRank))
        .filter(col("__vr") <= d * q + 1)
        .select("id", "len", "pos", "gh")
      med3("fz_prefix")(prefix)
      val w = d + 1
      val left = prefix.select(col("id").as("id1"), col("len").as("len1"),
        col("pos").as("p1"), col("gh"), (col("pos") / w).cast("int").as("band"))
      val right = prefix.select(col("id").as("id2"), col("len").as("len2"),
        col("pos").as("p2"), col("gh"),
        explode(array((-1 to 1).map(delta => (col("pos") / w).cast("int") + delta): _*))
          .as("band"))
      val candA = left.join(right,
          left("gh") === right("gh") && left("band") === right("band") &&
            col("id1") < col("id2") &&
            abs(col("p1") - col("p2")) <= d &&
            abs(col("len1") - col("len2")) <= d,
          "inner")
        .filter(greatest(col("len1"), col("len2")) >= q * (d + 1))
        .select("id1", "id2").distinct()
      // current-pipeline stage isolation: strings ride the prefix; join with
      // residual filters only vs + levenshtein
      locally {
        val prefixS = llm.Pin(grams.join(gramDf, "gh")
          .withColumn("__vr", dense_rank().over(wRank))
          .filter(col("__vr") <= d * q + 1)
          .join(slim.select(col("id"), col("s")), Seq("id"))
          .select(col("id"), col("len"), col("pos"), col("gh"), col("s"))).df
        val l2 = prefixS.select(col("id").as("id1"), col("len").as("len1"),
          col("s").as("__s1"), col("pos").as("p1"), col("gh"),
          (col("pos") / w).cast("int").as("band"))
        val r2 = prefixS.select(col("id").as("id2"), col("len").as("len2"),
          col("s").as("__s2"), col("pos").as("p2"), col("gh"),
          explode(array((-1 to 1).map(dd => (col("pos") / w).cast("int") + dd): _*))
            .as("band"))
        val joined2 = l2.join(r2,
            l2("gh") === r2("gh") && l2("band") === r2("band") &&
              col("id1") < col("id2") &&
              abs(col("p1") - col("p2")) <= d &&
              abs(col("len1") - col("len2")) <= d, "inner")
          .filter(greatest(col("len1"), col("len2")) >= q * (d + 1))
        med3("fz_join_nolev")(joined2.groupBy().count())
        med3("fz_join_strread")(joined2
          .select((length(col("__s1")) + length(col("__s2"))).as("_l"))
          .groupBy().sum("_l"))
        med3("fz_join_lev")(joined2
          .withColumn("dist", levenshtein(col("__s1"), col("__s2"), d))
          .filter(col("dist") >= 0).select("id1", "id2", "dist"))
        val blev = org.apache.spark.sql.GraftExpressionBridge.column(
          graft.functions.BoundedLevenshtein(
            org.apache.spark.sql.GraftExpressionBridge.expression(col("__s1")),
            org.apache.spark.sql.GraftExpressionBridge.expression(col("__s2")), d))
        med3("fz_join_blev")(joined2
          .withColumn("dist", blev)
          .filter(col("dist") >= 0).select("id1", "id2", "dist"))
      }
      med3("fz_candA")(candA)
      med3("fz_full")(llm.FuzzyJoinOps.fuzzySelfJoin(docsM, "id", "s", 2))
      dumpPlan(llm.FuzzyJoinOps.fuzzySelfJoin(docsM, "id", "s", 2),
        "plans/r10/fuzzy_join_pairs_after.txt")
      println("[opt] prefix rows=" + prefix.count())
      val joined = left.join(right,
          left("gh") === right("gh") && left("band") === right("band") &&
            col("id1") < col("id2") &&
            abs(col("p1") - col("p2")) <= d &&
            abs(col("len1") - col("len2")) <= d,
          "inner")
        .filter(greatest(col("len1"), col("len2")) >= q * (d + 1))
      println("[opt] candA pre-distinct=" + joined.count() +
        " distinct=" + candA.count())
      val bucketTop = prefix.groupBy("gh").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc).limit(5).collect()
      println("[opt] hottest prefix gram values: " +
        bucketTop.map(r => r.getLong(1)).mkString(","))
      println("[opt] output pairs=" +
        llm.FuzzyJoinOps.fuzzySelfJoin(docsM, "id", "s", 2).count())
      val sg = docsM.groupBy("s").agg(count(lit(1)).as("m"))
      println("[opt] distinct strings=" + sg.count() +
        " maxGroup=" + sg.agg(max(col("m"))).collect()(0).getLong(0) +
        " sumSq=" + sg.agg(sum(col("m") * col("m"))).collect()(0).getLong(0))
      docsM.unpersist()
    }

    if (which("plans11")) {
      // r11 after-plans for the two ops whose r10 "before" dumps were
      // mislabeled (verdict item 2): the honest before-plans were dumped
      // from a worktree at ebef7dd (the r10 baseline commit); these are the
      // current-tree partners on the same bench fixtures.
      val docs = t("documents")
      val docsM = (0 until 10).map(i => docs
          .withColumn("doc_id", col("doc_id") + lit(i * 100000000L))
          .withColumn("text", translate(col("text"), "eE", s"$i$i")))
        .reduce(_ unionByName _).coalesce(32)
        .select(col("doc_id").as("id"), substring(col("text"), 1, 24).as("s"))
      dumpPlan(llm.FuzzyJoinOps.fuzzySelfJoin(docsM, "id", "s", 2),
        "plans/r11/fuzzy_join_pairs_after.txt")
      val emb1 = t("embeddings")
      val emb10 = (0 until 10).map(i =>
          emb1.withColumn("vec_id", col("vec_id") + lit(i * 100000000L)))
        .reduce(_ unionByName _).coalesce(32)
      val centroids10 = llm.SimilarityOps.ivfTrain(emb10, "vec_id", "embedding", 32)
      dumpPlan(llm.SimilarityOps.knnGraphWithCentroids(
        emb10, "vec_id", "embedding", k = 10, centroids10, nProbe = 8),
        "plans/r11/knn_graph_after.txt")
      println("[opt] r11 after-plans dumped")
    }

    if (which("plans11b")) {
      // r11 after-plans for this round's op changes (before-plans dumped
      // from a worktree at the pre-change commit): dedup_spans start-array
      // coverage, bm25 index doc-grouped path, fc_autoets pinned-partition
      // gather.
      val docs = t("documents")
      val docsSpan10 = (0 until 10).map(i => docs
          .withColumn("doc_id", col("doc_id") + lit(i * 100000000L))
          .withColumn("text", translate(col("text"), "eE", s"$i$i")))
        .reduce(_ unionByName _).coalesce(32)
      dumpPlan(llm.TextOps.removeDuplicatedSpans(docsSpan10, "doc_id", "text",
        gramLen = 20), "plans/r11/dedup_spans_after.txt")
      val docs10 = (0 until 10).map(i => docs
          .withColumn("doc_id", col("doc_id") + lit(i * 100000000L))
          .withColumn("text", concat(col("text"), lit(s" r$i"))))
        .reduce(_ unionByName _).coalesce(32)
      val queries = docs.filter(col("doc_id") < 20L)
        .select(col("doc_id").as("qid"), col("text"))
      val idxDir = java.nio.file.Files.createTempDirectory("graft_r11_bm25").toString
      llm.RetrievalOps.bm25BuildIndex(docs10, "doc_id", "text", idxDir,
        nTermBuckets = 64)
      dumpPlan(llm.RetrievalOps.bm25QueryIndex(spark, idxDir, queries,
        "qid", "text", k = 10), "plans/r11/bm25_index_topk_after.txt")
      med3("bm25_index_query_docgrouped")(llm.RetrievalOps.bm25QueryIndex(
        spark, idxDir, queries, "qid", "text", k = 10))
      med3("bm25_index_query_pruned_path")(llm.RetrievalOps.bm25QueryIndexPruned(
        spark, idxDir, queries, "qid", "text", k = 10))
      // bisect the doc-grouped path: scan cost vs qmeta prep vs scorer core
      val dgRead = spark.read.parquet(s"$idxDir/docgroup")
      println("[opt] docgroup scan partitions=" + dgRead.rdd.getNumPartitions)
      med3("bm25_docgroup_scan_only")(dgRead.select(col("doc"), col("terms"), col("tfs")))
      med3("bm25_postings_scan_only")(spark.read.parquet(s"$idxDir/postings"))
      locally {
        val tokq = filter(split(lower(trim(col("text"))), "[ \\t\\n\\r\\f]+"),
          x => length(x) > 0)
        val qterms = queries.select(col("qid").as("_qid"),
          explode(tokq).as("term")).distinct()
        val dfreq = spark.read.parquet(s"$idxDir/dfreq")
          .select(col("term"), col("df"))
        val stats = spark.read.parquet(s"$idxDir/stats")
        val qmeta = qterms.groupBy(col("term"))
          .agg(collect_list(col("_qid")).as("_qids"))
          .join(broadcast(dfreq), Seq("term"))
          .crossJoin(broadcast(stats))
          .withColumn("_idf", log(lit(1.0) +
            (col("n") - col("df") + lit(0.5)) / (col("df") + lit(0.5))))
          .select(col("term"), col("_qids"), col("_idf"), col("avgdl"))
        med3("bm25_dg_qmeta_prep_only")(qmeta)
        val metaRows = qmeta.collect()
        val qidField = queries.schema("qid")
        val scan = dgRead.select(col("doc").as("_doc"),
          col("terms").as("_terms"), col("tfs").as("_tfs"))
        med3("bm25_dg_score_core_only")(llm.RetrievalOps.multiQueryScore(
          scan, metaRows, qidField, org.apache.spark.sql.types.LongType,
          "qid", "doc_id", 10, 1.2, 0.75))
        med3("bm25_dg_score_core_repart32")(llm.RetrievalOps.multiQueryScore(
          scan.repartition(32), metaRows, qidField,
          org.apache.spark.sql.types.LongType, "qid", "doc_id", 10, 1.2, 0.75))
        // the path's own prep, replicated end-to-end: meta read + bucket
        // collect + bucket-pruned dfreq qmeta + collect
        def timeIt(tag: String)(f: => Unit): Unit = {
          f
          val ts = Seq.fill(3) {
            val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
          }.sorted
          println(f"[opt] $tag%-40s median=${ts(1)}%.3f all=${ts.map(x => f"$x%.3f")}")
        }
        timeIt("bm25_real_prep_only") {
          llm.RetrievalOps.indexQueryPrep(spark, idxDir, queries, "qid", "text")
          ()
        }
        locally {
          val prep = llm.RetrievalOps.indexQueryPrep(spark, idxDir, queries,
            "qid", "text")
          println(s"[opt] bm25 prep: buckets=${prep.buckets.length} " +
            s"nBuckets=${prep.nBuckets} hasDocGroup=${prep.hasDocGroup} " +
            s"picksDocGrouped=${prep.hasDocGroup && prep.buckets.length * 8 >= prep.nBuckets}")
          med3("bm25_real_dgcore_only")(llm.RetrievalOps.docGroupedCore(
            spark, idxDir, queries, "qid", prep.qmeta, 10, 1.2, 0.75))
          med3("bm25_real_prunedcore_only")(llm.RetrievalOps.prunedCore(
            spark, idxDir, "qid", prep.qmeta, prep.buckets, 10, 1.2, 0.75))
        }
        med3("bm25_index_query_docgrouped_2nd")(llm.RetrievalOps.bm25QueryIndex(
          spark, idxDir, queries, "qid", "text", k = 10))
        med3("bm25_index_query_pruned_2nd")(llm.RetrievalOps.bm25QueryIndexPruned(
          spark, idxDir, queries, "qid", "text", k = 10))
        timeIt("bm25_dg_prep_full") {
          val meta = spark.read.parquet(s"$idxDir/meta")
          val nb = meta.select(col("n_term_buckets")).collect()(0).getInt(0)
          meta.columns.contains("has_docgroup") &&
            meta.select(col("has_docgroup")).collect()(0).getBoolean(0)
          val qt = queries.select(col("qid").as("_qid"),
            explode(tokq).as("term")).distinct()
          val bks = qt.select(pmod(xxhash64(col("term")), lit(nb.toLong)).as("_b"))
            .distinct().collect().map(_.getLong(0)).toSeq
          val dfreqF = spark.read.parquet(s"$idxDir/dfreq")
            .filter(col("term_bucket").isin(bks: _*))
            .select(col("term"), col("df"))
          val qmetaF = qt.groupBy(col("term"))
            .agg(collect_list(col("_qid")).as("_qids"))
            .join(broadcast(dfreqF), Seq("term"))
            .crossJoin(broadcast(stats))
            .withColumn("_idf", log(lit(1.0) +
              (col("n") - col("df") + lit(0.5)) / (col("df") + lit(0.5))))
            .select(col("term"), col("_qids"), col("_idf"), col("avgdl"))
          qmetaF.collect()
          ()
        }
      }
      val us = t("events")
        .groupBy(col("user_id").as("g"), col("ts").cast(DateType).as("ds"))
        .agg(sum("value").as("y"))
      dumpPlan(ops.TsForecastOp.forecastBy(us, "g", "ds", "y", "AutoETS", 14,
        "1d", Map("seasonal_period" -> "7")), "plans/r11/fc_autoets_after.txt")
      println("[opt] r11b after-plans dumped")
    }

    if (which("unimax")) {
      val docs = t("documents")
      val docs10 = (0 until 10).map(i => docs
          .withColumn("doc_id", col("doc_id") + lit(i * 100000000L))
          .withColumn("text", concat(col("text"), lit(s" r$i"))))
        .reduce(_ unionByName _).coalesce(32).cache()
      println("[opt] unimax docs=" + docs10.count())
      med3("unimax_full")(llm.MixOps.unimaxSelect(docs10, "doc_id", "lang",
        "n_chars", totalBudget = 2000000L, maxEpochs = 0.5, seed = 9))
      med3("unimax_alloc_only")(llm.MixOps.unimaxAllocations(docs10, "lang",
        "n_chars", totalBudget = 2000000L, maxEpochs = 0.5))
      val width = llm.SampleOps.P / 4096 + 1
      val base = docs10.filter(col("n_chars") > 0)
        .withColumn("_b", llm.SampleOps.hashBucket(col("doc_id"), 9))
        .withColumn("_coarse", (col("_b") / width).cast("long"))
      med3("unimax_hist_only")(base.groupBy(col("lang"), col("_coarse"))
        .agg(sum(col("n_chars")).as("_t")))
      med3("unimax_base_only")(base)
      println("[opt] unimax kept=" + llm.MixOps.unimaxSelect(docs10, "doc_id",
        "lang", "n_chars", 2000000L, 0.5, 9).count())
      // A shared-histogram restructure (totals for the allocation windows
      // derived from the selection's own (strata, coarse) histogram, budget
      // riding the cum broadcast) was A/B-measured here at 1.60 s vs the
      // shipped chain's 1.03 s and REJECTED: exchange reuse does not fire
      // across broadcast subquery builds, and nesting the budget broadcast
      // inside the cum build serializes two builds the shipped plan runs in
      // parallel. See OPTIMIZATION_r10.md §unimax.
      docs10.unpersist()
    }

    if (which("q1")) {
      val li = t("lineitem")
      println("[opt] lineitem rows=" + li.count() +
        " partitions=" + li.rdd.getNumPartitions)
      med3("q1_current")(SparkEntry.queries("q1_pricing_summary")(spark, sfDir))
      def exactSumN(c: org.apache.spark.sql.Column, p: Int) =
        sum(round(c, 6).cast(DecimalType(p, 6))).cast(DoubleType)
      def q1With(p: Int) = li
        .filter(col("l_shipdate") <= lit("2000-12-01").cast(TimestampType))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(round(col("l_quantity"), 6).cast(DecimalType(p, 6))), 2).cast(DoubleType).as("sum_qty"),
          round(sum(round(col("l_extendedprice"), 6).cast(DecimalType(p, 6))), 2).cast(DoubleType).as("sum_base_price"),
          round(sum(round(col("l_extendedprice") * (lit(1) - col("l_discount")), 6).cast(DecimalType(p, 6))), 2).cast(DoubleType).as("sum_disc_price"),
          round(exactSumN(col("l_quantity"), p) / count(lit(1)), 6).as("avg_qty"),
          round(exactSumN(col("l_discount"), p) / count(lit(1)), 6).as("avg_disc"),
          count(lit(1)).as("count_order"))
      med3("q1_decimal18")(q1With(18))
      med3("q3_current")(SparkEntry.queries("q3_segment_revenue")(spark, sfDir))
      med3("q1_scan_only")(li
        .filter(col("l_shipdate") <= lit("2000-12-01").cast(TimestampType))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity")).as("s"), count(lit(1)).as("c")))
    }

    spark.stop()
  }
}
