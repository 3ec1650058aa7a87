package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.EntryShared.{docsWithNearDups, events}
import graft.functions.{TextFunctions => TF}
import graft.llm.Dedup

/** Round-9 optimization decomposition probe (guide §1: measure first).
  *
  * Times labeled sub-stages of the bench's heaviest CPU families through the
  * noop sink so the per-stage cost structure is measured, not inferred from
  * whole-query numbers. Wall + executor CPU per stage, min-of-N.
  *
  *   SPARK_GRAFT_CPUS=32 sbt "runMain graft.OptProbe /root/testdata/sf0.1 pairs,cc"
  *
  * Cases: pairs (n-gram Jaccard kernel stage ladder + volumes), cc
  * (pair-gen vs connected-components split), hits (edge build vs HITS
  * rounds), assoc (basket dedup vs a-priori pair join).
  */
object OptProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val which: Set[String] =
      if (args.length > 1) args(1).split(",").toSet
      else Set("pairs", "cc", "hits", "assoc")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val repeat = sys.env.getOrElse("SPARK_GRAFT_REPEAT", "2").toInt
    val spark = GraftSession.builder(s"local[$cpus]", "graft-optprobe")
      .config("spark.sql.shuffle.partitions", cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val meter = new org.apache.spark.graft.BenchMetrics(spark.sparkContext)

    def timePlan(label: String)(mk: => DataFrame): Unit = {
      val c0 = meter.cpuSeconds()
      val t0 = System.nanoTime()
      val df = mk
      df.write.format("noop").mode("overwrite").save()
      val w = (System.nanoTime() - t0) / 1e9
      val c = meter.cpuSeconds() - c0
      println(f"[opt] $label%-34s wall $w%7.2f s  cpu $c%7.2f s  [executed plan follows]")
      println(df.queryExecution.executedPlan.toString.take(20000))
      GraftSession.dropQueryState(spark)
    }

    def time(label: String)(mk: => DataFrame): Unit = {
      val times = (1 to repeat).map { _ =>
        val c0 = meter.cpuSeconds()
        val t0 = System.nanoTime()
        mk.write.format("noop").mode("overwrite").save()
        val w = (System.nanoTime() - t0) / 1e9
        val c = meter.cpuSeconds() - c0
        GraftSession.dropQueryState(spark)
        (w, c)
      }
      println(f"[opt] $label%-34s wall ${times.map(_._1).min}%7.2f s  cpu ${times.map(_._2).min}%7.2f s")
    }

    // ---- the shared n-gram Jaccard kernel, stage by stage ----
    def posting(s: SparkSession) = docsWithNearDups(s, sfDir)
      .select(col("doc_id").as("__id"),
        explode(array_distinct(
          graft.expressions.TextExpressions.ngramHashes(
            TF.normTokens(col("text")), 3))).as("__g"))

    if (which("pairs")) {
      val corpus = docsWithNearDups(spark, sfDir)
      println(s"[opt] corpus rows = ${corpus.count()}")
      time("pairs/1 posting explode")(posting(spark))
      val p = posting(spark).persist()
      println(s"[opt] posting rows = ${p.count()}")
      val rare = p.groupBy(col("__g")).agg(count(lit(1)).as("__df"))
        .filter(col("__df").between(2, 400))
      println(s"[opt] rare grams = ${rare.count()}")
      val rp = p.join(rare, Seq("__g")).persist()
      println(s"[opt] rare-posting rows = ${rp.count()}")
      val cand = rp.select(col("__g"), col("__id").as("idA"))
        .join(rp.select(col("__g"), col("__id").as("idB")), Seq("__g"))
        .filter(col("idA") < col("idB"))
      println(s"[opt] candidate pair occurrences C = ${cand.count()}")
      val inter = cand.groupBy(col("idA"), col("idB"))
        .agg(count(lit(1)).as("__inter"))
      println(s"[opt] distinct candidate pairs = ${inter.count()}")
      time("pairs/2 self-join+count (cached rp)")(inter)
      p.unpersist(); rp.unpersist()
      time("pairs/3 full kernel")(
        Dedup.ngramJaccardPairs(docsWithNearDups(spark, sfDir), "text",
          "doc_id", n = 3, threshold = 0.3, maxShingleFreq = 400))
    }

    // Interleaved A/B/N: run all variants back-to-back per round so the
    // box's ~20-min load cycle hits every variant equally (round-9 lesson:
    // non-bracketed readings across windows mislabel 1.5x swings as code).
    def compare(rounds: Int)(variants: (String, () => DataFrame)*): Unit = {
      val acc = scala.collection.mutable.Map.empty[String, List[(Double, Double)]]
      for (r <- 1 to rounds; (label, mk) <- variants) {
        val load = scala.io.Source.fromFile("/proc/loadavg").mkString.split(" ")(0)
        val c0 = meter.cpuSeconds()
        val t0 = System.nanoTime()
        mk().write.format("noop").mode("overwrite").save()
        val w = (System.nanoTime() - t0) / 1e9
        val c = meter.cpuSeconds() - c0
        GraftSession.dropQueryState(spark)
        acc(label) = acc.getOrElse(label, Nil) :+ (w, c)
        println(f"[opt]   round $r $label%-28s wall $w%7.2f  cpu $c%7.2f  load1m $load")
      }
      for ((label, _) <- variants) {
        val xs = acc(label)
        println(f"[opt] MIN $label%-30s wall ${xs.map(_._1).min}%7.2f s  cpu ${xs.map(_._2).min}%7.2f s")
      }
    }

    if (which("ab1")) {
      def kernelFull = () =>
        Dedup.ngramJaccardPairs(docsWithNearDups(spark, sfDir), "text",
          "doc_id", n = 3, threshold = 0.3, maxShingleFreq = 400)
      def kernelIds = () => kernelFull().select(col("idA"), col("idB"))
      def kernel2 = () => {
        val posting0 = posting(spark)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val rare = posting0.groupBy(col("__g"))
          .agg(count(lit(1)).as("__df"))
          .filter(col("__df").between(2, 400))
        val rp = posting0.join(rare.select(col("__g")), Seq("__g"))
        val rpz = rp.withColumn("__sz",
          count(lit(1)).over(org.apache.spark.sql.expressions.Window
            .partitionBy(col("__id"))))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        rpz.select(col("__g"), col("__id").as("idA"), col("__sz").as("__szA"))
          .join(rpz.select(col("__g"), col("__id").as("idB"),
            col("__sz").as("__szB")), Seq("__g"))
          .filter(col("idA") < col("idB"))
          .groupBy(col("idA"), col("idB"))
          .agg(count(lit(1)).as("__inter"), min(col("__szA")).as("__szA"),
            min(col("__szB")).as("__szB"))
          .withColumn("jaccard", col("__inter").cast("double") /
            (col("__szA") + col("__szB") - col("__inter")).cast("double"))
          .filter(col("jaccard") >= 0.3)
          .select(col("idA"), col("idB"), col("jaccard"))
      }
      compare(3)(
        "kernel-current" -> kernelFull,
        "kernel-ids-only" -> kernelIds,
        "kernel-carried-sz" -> kernel2)
    }

    if (which("ab2")) {
      def pairs = () =>
        Dedup.ngramJaccardPairs(docsWithNearDups(spark, sfDir), "text",
          "doc_id", n = 3, threshold = 0.3, maxShingleFreq = 400)
          .select(col("idA"), col("idB"))
      compare(3)(
        "cc-as-q65" -> (() => Dedup.connectedComponents(pairs())),
        "cc-ckpt-pairs" -> (() =>
          Dedup.connectedComponents(pairs().localCheckpoint(true))))
    }

    if (which("q122")) {
      import graft.ops.Sampling
      def corpus = docsWithNearDups(spark, sfDir)
      def pairs = Dedup.ngramJaccardPairs(corpus, "text", "doc_id",
          n = 3, threshold = 0.3, maxShingleFreq = 400)
        .select(col("idA"), col("idB"))
      def split = Dedup.splitByCluster(corpus, "doc_id", pairs,
        Seq(80, 10, 10), labelCol = Some("cluster"))
      compare(3)(
        "q122/a cc only" -> (() => Dedup.connectedComponents(pairs)),
        "q122/b splitByCluster" -> (() => split),
        "q122/c full q122" -> (() => {
          val naive = Sampling.splitByKey(
            split.select(col("doc_id"), col("split"), col("cluster")),
            "doc_id", Seq(80, 10, 10), outCol = "naive_split")
          naive.groupBy(col("split"))
            .agg(count(lit(1)).as("n_docs"),
              countDistinct(col("cluster")).as("n_clusters"),
              sum(when(col("naive_split") =!= col("split"), 1L).otherwise(0L))
                .as("n_moved_vs_naive"))
        }))
    }

    if (which("ccsynth")) {
      // CC loop cost with a FREE edge generator: 12k synthetic pairs in
      // ~4.7k star clusters (the q65 shape), checkpointed so the loop's
      // own cost is the only thing timed.
      def synth = spark.range(12000)
        .select((col("id") % 4700L).as("idA"), (col("id") + 20000L).as("idB"))
        .localCheckpoint(true)
      compare(3)(
        "ccsynth/loop only" -> (() => Dedup.connectedComponents(synth)),
        "ccsynth/edges job only" -> (() => synth))
    }

    if (which("assoc2")) {
      def baskets = events(spark, sfDir)
        .select(col("user_id").as("basket"),
          get_json_object(col("props"), "$.k").cast("long").as("item"))
      def stages(stop: String): DataFrame = {
        val b = baskets.filter(col("item").isNotNull).distinct()
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val n = b.agg(countDistinct(col("basket")).as("n_baskets"))
        val freq = b.groupBy(col("item")).agg(count(lit(1)).as("c_item"))
          .crossJoin(broadcast(n))
          .filter(col("c_item") >= ceil(lit(0.2) * col("n_baskets")))
          .select(col("item"), col("c_item"))
        if (stop == "freq") return freq
        val fb = b.join(freq.select(col("item")), Seq("item"))
        val pairs = fb.select(col("basket"), col("item").as("a"))
          .join(fb.select(col("basket"), col("item").as("b")), Seq("basket"))
          .filter(col("a") < col("b"))
          .groupBy(col("a"), col("b")).agg(count(lit(1)).as("c_pair"))
          .crossJoin(broadcast(n))
          .filter(col("c_pair") >= ceil(lit(0.2) * col("n_baskets")))
        if (stop == "pairs") return pairs
        val both = pairs
          .select(col("a").as("antecedent"), col("b").as("consequent"),
            col("c_pair"), col("n_baskets"))
          .unionAll(pairs.select(col("b").as("antecedent"),
            col("a").as("consequent"), col("c_pair"), col("n_baskets")))
        if (stop == "both") return both
        both
          .join(freq.select(col("item").as("antecedent"),
            col("c_item").as("c_ante")), Seq("antecedent"))
          .join(freq.select(col("item").as("consequent"),
            col("c_item").as("c_cons")), Seq("consequent"))
          .select(col("antecedent"), col("consequent"), col("c_pair"),
            round(col("c_pair").cast("double") / col("n_baskets"), 6)
              .as("support"))
      }
      compare(3)(
        "assoc2/freq" -> (() => stages("freq")),
        "assoc2/pairs" -> (() => stages("pairs")),
        "assoc2/both" -> (() => stages("both")),
        "assoc2/full" -> (() => stages("full")))
    }

    if (which("counts")) {
      val pairs = Dedup.ngramJaccardPairs(docsWithNearDups(spark, sfDir),
          "text", "doc_id", n = 3, threshold = 0.3, maxShingleFreq = 400)
        .select(col("idA"), col("idB")).localCheckpoint(true)
      println(s"[opt] kernel output pairs P = ${pairs.count()}")
      val edges = pairs.select(col("idA").as("src"), col("idB").as("dst"))
        .union(pairs.select(col("idB").as("src"), col("idA").as("dst")))
        .distinct().localCheckpoint(true)
      println(s"[opt] symmetric distinct edges = ${edges.count()}")
      println(s"[opt] nodes = ${edges.select(col("src")).distinct().count()}")
      val (labels, iters) = Dedup.connectedComponentsWithStats(pairs)
      println(s"[opt] cc rounds = $iters, labeled nodes = ${labels.count()}")
      println(s"[opt] components = ${labels.select(col("component")).distinct().count()}")
    }

    if (which("plans")) {
      timePlan("plans/full kernel")(
        Dedup.ngramJaccardPairs(docsWithNearDups(spark, sfDir), "text",
          "doc_id", n = 3, threshold = 0.3, maxShingleFreq = 400))
      timePlan("plans/kernel ids only")(
        Dedup.ngramJaccardPairs(docsWithNearDups(spark, sfDir), "text",
          "doc_id", n = 3, threshold = 0.3, maxShingleFreq = 400)
          .select(col("idA"), col("idB")))
    }

    if (which("pairs2")) {
      // carried-sizes variant: attach each doc's rare-gram count to the
      // posting rows BEFORE the self-join, so no post-aggregation joins
      // are needed — the jaccard inputs are identical integers.
      def kernel2 = {
        val posting0 = posting(spark)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val rare = posting0.groupBy(col("__g"))
          .agg(count(lit(1)).as("__df"))
          .filter(col("__df").between(2, 400))
        val rp = posting0.join(rare.select(col("__g")), Seq("__g"))
        val rpz = rp.withColumn("__sz",
          count(lit(1)).over(org.apache.spark.sql.expressions.Window
            .partitionBy(col("__id"))))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        rpz.select(col("__g"), col("__id").as("idA"), col("__sz").as("__szA"))
          .join(rpz.select(col("__g"), col("__id").as("idB"),
            col("__sz").as("__szB")), Seq("__g"))
          .filter(col("idA") < col("idB"))
          .groupBy(col("idA"), col("idB"))
          .agg(count(lit(1)).as("__inter"), min(col("__szA")).as("__szA"),
            min(col("__szB")).as("__szB"))
          .withColumn("jaccard", col("__inter").cast("double") /
            (col("__szA") + col("__szB") - col("__inter")).cast("double"))
          .filter(col("jaccard") >= 0.3)
          .select(col("idA"), col("idB"), col("jaccard"))
      }
      time("pairs2/carried sizes full")(kernel2)
      time("pairs2/current kernel again")(
        Dedup.ngramJaccardPairs(docsWithNearDups(spark, sfDir), "text",
          "doc_id", n = 3, threshold = 0.3, maxShingleFreq = 400))
    }

    if (which("cc")) {
      def pairs = Dedup.ngramJaccardPairs(docsWithNearDups(spark, sfDir),
          "text", "doc_id", n = 3, threshold = 0.3, maxShingleFreq = 400)
        .select(col("idA"), col("idB"))
      time("cc/1 pairs only")(pairs)
      time("cc/2 cc on checkpointed pairs") {
        Dedup.connectedComponents(pairs.localCheckpoint(true))
      }
      time("cc/3 cc as q65 runs it")(Dedup.connectedComponents(pairs))
    }

    if (which("hits")) {
      import org.apache.spark.sql.expressions.Window
      def edges = {
        val byUser = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        events(spark, sfDir)
          .select(col("user_id"), col("event_id"), col("ts"),
            get_json_object(col("props"), "$.k").cast("long").as("item"))
          .withColumn("src", lag(col("item"), 1).over(byUser))
          .filter(col("src").isNotNull && col("src") =!= col("item"))
          .select(col("src"), col("item").as("dst"))
      }
      time("hits/1 edges only")(edges)
      println(s"[opt] distinct edges = ${edges.distinct().count()}")
      time("hits/2 hits(2 rounds)")(graft.ops.Graph.hits(edges, nIter = 2))
    }

    if (which("hits2")) {
      // Sparse-state HITS variant: (a) zero-score nodes add exactly 0.0 to
      // every downstream sum, so the per-half-round `nodes leftjoin` zero-fill
      // can move to the END of the loop; (b) checkpoint the RAW half-round
      // aggregate and derive both the norm and the normalized frame from the
      // checkpointed rows, so the join+agg subtree executes once per
      // half-round instead of twice (norm pass + output pass).
      import org.apache.spark.sql.expressions.Window
      def edges = {
        val byUser = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        events(spark, sfDir)
          .select(col("user_id"), col("event_id"), col("ts"),
            get_json_object(col("props"), "$.k").cast("long").as("item"))
          .withColumn("src", lag(col("item"), 1).over(byUser))
          .filter(col("src").isNotNull && col("src") =!= col("item"))
          .select(col("src"), col("item").as("dst"))
      }
      def hitsSparse(nIter: Int): DataFrame = {
        def ckpt(df: DataFrame): DataFrame = df.localCheckpoint(true)
        val e = ckpt(edges.select(col("src"), col("dst"))
          .filter(col("src").isNotNull && col("dst").isNotNull).distinct())
        val nodes = e.select(col("src").as("node"))
          .union(e.select(col("dst").as("node"))).distinct()
        def norm(df: DataFrame, c: String): DataFrame = {
          val n = df.agg(sqrt(sum(col(c) * col(c))).as("__n"))
          df.crossJoin(broadcast(n))
            .select(col("node"), (col(c) / col("__n")).as(c))
        }
        var hub = e.select(col("src").as("node")).distinct()
          .select(col("node"), lit(1.0).as("hub"))
        var auth: DataFrame = null
        for (_ <- 1 to nIter) {
          val authRaw = ckpt(
            e.join(hub.withColumnRenamed("node", "src"), Seq("src"))
              .groupBy(col("dst").as("node")).agg(sum(col("hub")).as("auth")))
          auth = norm(authRaw, "auth")
          val hubRaw = ckpt(
            e.join(auth.withColumnRenamed("node", "dst"), Seq("dst"))
              .groupBy(col("src").as("node")).agg(sum(col("auth")).as("hub")))
          hub = norm(hubRaw, "hub")
        }
        nodes.join(auth, Seq("node"), "left").join(hub, Seq("node"), "left")
          .select(col("node"), coalesce(col("auth"), lit(0.0)).as("auth"),
            coalesce(col("hub"), lit(0.0)).as("hub"))
      }
      compare(3)(
        "hits2/current" -> (() => graft.ops.Graph.hits(edges, nIter = 2)),
        "hits2/sparse" -> (() => hitsSparse(2)))
    }

    if (which("q210ab")) {
      def baskets0 = {
        val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
        val pt = spark.read.parquet(s"$sfDir/part.parquet")
          .select(col("p_partkey"), col("p_brand"))
        li.join(pt, col("l_partkey") === col("p_partkey"))
          .select(col("l_orderkey").as("ok"), col("p_brand").as("b"))
          .distinct()
      }
      def q210(materialize: String): DataFrame = {
        val baskets = materialize match {
          case "persist" => baskets0.persist()
          case "ckpt"    => baskets0.localCheckpoint(true)
          case _         => baskets0
        }
        val nOrders = baskets.agg(
          countDistinct(col("ok")).cast("double").as("n_orders"))
        val brandN = baskets.groupBy(col("b")).agg(count(lit(1)).as("n"))
        val pairs = baskets.as("x")
          .join(baskets.as("y"), col("x.ok") === col("y.ok") &&
            col("x.b") < col("y.b"))
          .groupBy(col("x.b").as("b1"), col("y.b").as("b2"))
          .agg(count(lit(1)).as("n_ab"))
        pairs
          .join(broadcast(brandN.select(col("b").as("b1"), col("n").as("n_a"))), "b1")
          .join(broadcast(brandN.select(col("b").as("b2"), col("n").as("n_b"))), "b2")
          .crossJoin(broadcast(nOrders))
          .select(col("b1"), col("b2"), col("n_ab"),
            round(col("n_ab").cast("double") * col("n_orders") /
              (col("n_a").cast("double") * col("n_b").cast("double")), 4)
              .as("lift"))
          .orderBy(col("n_ab").desc, col("b1"), col("b2"))
          .limit(20)
      }
      compare(3)(
        "q210/persist (current)" -> (() => q210("persist")),
        "q210/ckpt" -> (() => q210("ckpt")),
        "q210/none (reuse)" -> (() => q210("none")))
    }

    if (which("packab")) {
      // Packed pair key: doc ids here are < 2^31 (base ids + 100000 offset),
      // so (idA, idB) packs exactly into one long — halves the hash-agg key
      // width on the kernel's dominant 4-5M-group aggregate.
      def kernelPacked = () => {
        val posting0 = posting(spark)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val rare = posting0.groupBy(col("__g"))
          .agg(count(lit(1)).as("__df"))
          .filter(col("__df").between(2, 400))
        val rp = posting0.join(rare.select(col("__g")), Seq("__g"))
        val sizes = rp.groupBy(col("__id")).agg(count(lit(1)).as("__sz"))
        val inter = rp.select(col("__g"), col("__id").as("idA"))
          .join(rp.select(col("__g"), col("__id").as("idB")), Seq("__g"))
          .filter(col("idA") < col("idB"))
          .select((shiftleft(col("idA"), 32) + col("idB")).as("__pk"))
          .groupBy(col("__pk"))
          .agg(count(lit(1)).as("__inter"))
          .select(shiftright(col("__pk"), 32).as("idA"),
            col("__pk").bitwiseAND(lit(0xFFFFFFFFL)).as("idB"),
            col("__inter"))
        inter
          .join(sizes.select(col("__id").as("idA"), col("__sz").as("__szA")), Seq("idA"))
          .join(sizes.select(col("__id").as("idB"), col("__sz").as("__szB")), Seq("idB"))
          .withColumn("jaccard", col("__inter").cast("double") /
            (col("__szA") + col("__szB") - col("__inter")).cast("double"))
          .filter(col("jaccard") >= 0.3)
          .select(col("idA"), col("idB"), col("jaccard"))
      }
      def kernelCurrent = () =>
        Dedup.ngramJaccardPairs(docsWithNearDups(spark, sfDir), "text",
          "doc_id", n = 3, threshold = 0.3, maxShingleFreq = 400)
      compare(3)(
        "pack/current" -> kernelCurrent,
        "pack/packed-key" -> kernelPacked)
    }

    if (which("kab")) {
      // Decompose the packab win: persist->localCheckpoint materialization
      // vs the packed pair key, separately.
      def kernelVariant(mat: String, packed: Boolean) = () => {
        def m(df: DataFrame): DataFrame = mat match {
          case "persist" =>
            df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          case "ckpt" => df.localCheckpoint(true)
          case _      => df
        }
        val posting0 = m(posting(spark))
        val rare = posting0.groupBy(col("__g"))
          .agg(count(lit(1)).as("__df"))
          .filter(col("__df").between(2, 400))
        val rp = m(posting0.join(rare.select(col("__g")), Seq("__g")))
        val sizes = rp.groupBy(col("__id")).agg(count(lit(1)).as("__sz"))
        val inter =
          if (packed)
            rp.select(col("__g"), col("__id").as("idA"))
              .join(rp.select(col("__g"), col("__id").as("idB")), Seq("__g"))
              .filter(col("idA") < col("idB"))
              .select((shiftleft(col("idA"), 32) + col("idB")).as("__pk"))
              .groupBy(col("__pk")).agg(count(lit(1)).as("__inter"))
              .select(shiftright(col("__pk"), 32).as("idA"),
                col("__pk").bitwiseAND(lit(0xFFFFFFFFL)).as("idB"),
                col("__inter"))
          else
            rp.select(col("__g"), col("__id").as("idA"))
              .join(rp.select(col("__g"), col("__id").as("idB")), Seq("__g"))
              .filter(col("idA") < col("idB"))
              .groupBy(col("idA"), col("idB")).agg(count(lit(1)).as("__inter"))
        inter
          .join(sizes.select(col("__id").as("idA"), col("__sz").as("__szA")), Seq("idA"))
          .join(sizes.select(col("__id").as("idB"), col("__sz").as("__szB")), Seq("idB"))
          .withColumn("jaccard", col("__inter").cast("double") /
            (col("__szA") + col("__szB") - col("__inter")).cast("double"))
          .filter(col("jaccard") >= 0.3)
          .select(col("idA"), col("idB"), col("jaccard"))
      }
      compare(3)(
        "kab/persist (current)" -> kernelVariant("persist", packed = false),
        "kab/ckpt" -> kernelVariant("ckpt", packed = false),
        "kab/ckpt+packed" -> kernelVariant("ckpt", packed = true),
        "kab/none (reuse)" -> kernelVariant("none", packed = false))
    }

    if (which("lazyab")) {
      // eager vs LAZY localCheckpoint: lazy fuses materialization into the
      // first consumer job (no serial barrier; the post-r9-conversion bench
      // showed kernel-family wall +3s from the eager barriers) while keeping
      // the raw-row storage that beat the columnar cache on CPU.
      def kernelMat(mat: String) = () => {
        def m(df: DataFrame): DataFrame = mat match {
          case "eager" => df.localCheckpoint(true)
          case "lazy"  => df.localCheckpoint(false)
          case _       => df
        }
        val posting0 = m(posting(spark))
        val rare = posting0.groupBy(col("__g"))
          .agg(count(lit(1)).as("__df"))
          .filter(col("__df").between(2, 400))
        val rp = m(posting0.join(rare.select(col("__g")), Seq("__g")))
        val sizes = rp.groupBy(col("__id")).agg(count(lit(1)).as("__sz"))
        rp.select(col("__g"), col("__id").as("idA"))
          .join(rp.select(col("__g"), col("__id").as("idB")), Seq("__g"))
          .filter(col("idA") < col("idB"))
          .groupBy(col("idA"), col("idB")).agg(count(lit(1)).as("__inter"))
          .join(sizes.select(col("__id").as("idA"), col("__sz").as("__szA")), Seq("idA"))
          .join(sizes.select(col("__id").as("idB"), col("__sz").as("__szB")), Seq("idB"))
          .withColumn("jaccard", col("__inter").cast("double") /
            (col("__szA") + col("__szB") - col("__inter")).cast("double"))
          .filter(col("jaccard") >= 0.3)
          .select(col("idA"), col("idB"), col("jaccard"))
      }
      def basketsLazy(mat: String) = () => {
        val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
        val pt = spark.read.parquet(s"$sfDir/part.parquet")
          .select(col("p_partkey"), col("p_brand"))
        val b0 = li.join(pt, col("l_partkey") === col("p_partkey"))
          .select(col("l_orderkey").as("ok"), col("p_brand").as("b"))
          .distinct()
        val baskets = if (mat == "eager") b0.localCheckpoint(true)
                      else b0.localCheckpoint(false)
        val nOrders = baskets.agg(
          countDistinct(col("ok")).cast("double").as("n_orders"))
        val brandN = baskets.groupBy(col("b")).agg(count(lit(1)).as("n"))
        val pairs = baskets.as("x")
          .join(baskets.as("y"), col("x.ok") === col("y.ok") &&
            col("x.b") < col("y.b"))
          .groupBy(col("x.b").as("b1"), col("y.b").as("b2"))
          .agg(count(lit(1)).as("n_ab"))
        pairs
          .join(broadcast(brandN.select(col("b").as("b1"), col("n").as("n_a"))), "b1")
          .join(broadcast(brandN.select(col("b").as("b2"), col("n").as("n_b"))), "b2")
          .crossJoin(broadcast(nOrders))
          .select(col("b1"), col("b2"), col("n_ab"),
            round(col("n_ab").cast("double") * col("n_orders") /
              (col("n_a").cast("double") * col("n_b").cast("double")), 4)
              .as("lift"))
          .orderBy(col("n_ab").desc, col("b1"), col("b2"))
          .limit(20)
      }
      def kernelRpOnly = () => {
        // no posting materialization: posting feeds BOTH the gram-df agg and
        // the rp join through ONE reused exchange on __g; only rp (consumed
        // 3x: sizes + both self-join sides) checkpoints — 1 barrier, not 2
        val posting0 = posting(spark)
        val rare = posting0.groupBy(col("__g"))
          .agg(count(lit(1)).as("__df"))
          .filter(col("__df").between(2, 400))
        val rp = posting0.join(rare.select(col("__g")), Seq("__g"))
          .localCheckpoint(true)
        val sizes = rp.groupBy(col("__id")).agg(count(lit(1)).as("__sz"))
        rp.select(col("__g"), col("__id").as("idA"))
          .join(rp.select(col("__g"), col("__id").as("idB")), Seq("__g"))
          .filter(col("idA") < col("idB"))
          .groupBy(col("idA"), col("idB")).agg(count(lit(1)).as("__inter"))
          .join(sizes.select(col("__id").as("idA"), col("__sz").as("__szA")), Seq("idA"))
          .join(sizes.select(col("__id").as("idB"), col("__sz").as("__szB")), Seq("idB"))
          .withColumn("jaccard", col("__inter").cast("double") /
            (col("__szA") + col("__szB") - col("__inter")).cast("double"))
          .filter(col("jaccard") >= 0.3)
          .select(col("idA"), col("idB"), col("jaccard"))
      }
      compare(3)(
        "lazy/kernel eager" -> kernelMat("eager"),
        "lazy/kernel lazy" -> kernelMat("lazy"),
        "lazy/kernel rp-only" -> kernelRpOnly,
        "lazy/q210 eager" -> basketsLazy("eager"),
        "lazy/q210 lazy" -> basketsLazy("lazy"))
    }

    if (which("shj")) {
      // The ckpt kernel's remaining wall is serial: the self-join broadcasts
      // the 1.3M-row rp side (driver-side collect+build). SHUFFLE_HASH
      // replaces that with a parallel 32-task exchange on __g.
      def kernelJoin(mode: String) = () => {
        val posting0 = posting(spark).localCheckpoint(false)
        val rare = posting0.groupBy(col("__g"))
          .agg(count(lit(1)).as("__df"))
          .filter(col("__df").between(2, 400))
        val rp = posting0.join(rare.select(col("__g")), Seq("__g"))
          .localCheckpoint(false)
        val sizes = rp.groupBy(col("__id")).agg(count(lit(1)).as("__sz"))
        val l = rp.select(col("__g"), col("__id").as("idA"))
        val r0 = rp.select(col("__g"), col("__id").as("idB"))
        val r = mode match {
          case "shj" => r0.hint("shuffle_hash")
          case "smj" => r0.hint("merge")
          case _     => r0
        }
        l.join(r, Seq("__g"))
          .filter(col("idA") < col("idB"))
          .groupBy(col("idA"), col("idB")).agg(count(lit(1)).as("__inter"))
          .join(sizes.select(col("__id").as("idA"), col("__sz").as("__szA")), Seq("idA"))
          .join(sizes.select(col("__id").as("idB"), col("__sz").as("__szB")), Seq("idB"))
          .withColumn("jaccard", col("__inter").cast("double") /
            (col("__szA") + col("__szB") - col("__inter")).cast("double"))
          .filter(col("jaccard") >= 0.3)
          .select(col("idA"), col("idB"), col("jaccard"))
      }
      compare(3)(
        "shj/auto (bhj)" -> kernelJoin("auto"),
        "shj/shuffle-hash" -> kernelJoin("shj"),
        "shj/sort-merge" -> kernelJoin("smj"))
    }

    if (which("k10")) {
      // Round-10 kernel ladder (VERDICT item 3): the count-join kernel's
      // steady state vs (a) prefix filtering layered on the shuffle_hash
      // join (r8's prefix negative predates the SHJ conversion), (b) pair
      // generation via per-gram combination explode instead of the
      // posting-list self-join (shuffles posting once, not twice), and
      // (c) the packed-long pair key re-check on top of (b).
      def kernelCurrent = () =>
        Dedup.ngramJaccardPairs(docsWithNearDups(spark, sfDir), "text",
          "doc_id", n = 3, threshold = 0.3, maxShingleFreq = 400)
      def kernelPrefixShj = () =>
        Dedup.ngramJaccardPairs(docsWithNearDups(spark, sfDir), "text",
          "doc_id", n = 3, threshold = 0.3, maxShingleFreq = 400,
          prefixFilter = Some(true))
      def kernelPairGen(packed: Boolean) = () => {
        val posting0 = posting(spark).localCheckpoint(false)
        val rare = posting0.groupBy(col("__g"))
          .agg(count(lit(1)).as("__df"))
          .filter(col("__df").between(2, 400))
        val rp = posting0.join(rare.select(col("__g")), Seq("__g"))
          .localCheckpoint(false)
        val sizes = rp.groupBy(col("__id")).agg(count(lit(1)).as("__sz"))
        // one shuffle by __g -> sorted id list per gram -> all C(k,2)
        // ordered pairs from adjacent array slots, exploded in codegen
        val lists = rp.groupBy(col("__g"))
          .agg(sort_array(collect_list(col("__id"))).as("__ids"))
        val pairsCol = expr(
          "flatten(transform(__ids, (a, i) -> " +
            "transform(slice(__ids, i + 2, size(__ids) - i - 1), " +
            "b -> struct(a AS idA, b AS idB))))")
        val occ = lists.select(explode(pairsCol).as("__p"))
        val inter =
          if (packed)
            occ.select((shiftleft(col("__p.idA"), 32) + col("__p.idB")).as("__pk"))
              .groupBy(col("__pk")).agg(count(lit(1)).as("__inter"))
              .select(shiftright(col("__pk"), 32).as("idA"),
                col("__pk").bitwiseAND(lit(0xFFFFFFFFL)).as("idB"),
                col("__inter"))
          else
            occ.select(col("__p.idA").as("idA"), col("__p.idB").as("idB"))
              .groupBy(col("idA"), col("idB")).agg(count(lit(1)).as("__inter"))
        inter
          .join(sizes.select(col("__id").as("idA"), col("__sz").as("__szA")), Seq("idA"))
          .join(sizes.select(col("__id").as("idB"), col("__sz").as("__szB")), Seq("idB"))
          .withColumn("jaccard", col("__inter").cast("double") /
            (col("__szA") + col("__szB") - col("__inter")).cast("double"))
          .filter(col("jaccard") >= 0.3)
          .select(col("idA"), col("idB"), col("jaccard"))
      }
      compare(3)(
        "k10/current count-join" -> kernelCurrent,
        "k10/prefix+shj" -> kernelPrefixShj,
        "k10/pair-gen explode" -> kernelPairGen(packed = false),
        "k10/pair-gen packed" -> kernelPairGen(packed = true))
    }

    if (which("shjgate")) {
      // Round-10 gate evidence for the two shuffle_hash hints (VERDICT
      // "what's wrong" #6): a ShuffledHashJoin build side must fit ONE
      // post-shuffle partition in memory (no spill on the build side).
      // Replicate Spark's partition assignment exactly — HashPartitioning
      // uses Murmur3 (the SQL hash() function) pmod numPartitions — and
      // report the max/median build-partition rows and bytes at this
      // fixture. Kernel build side: (__g long, __id long) = 16 B payload
      // (~48 B with row overhead); tfidf build side: (term string, doc_id
      // long, w double) — measure actual string bytes.
      val nPart = spark.conf.get("spark.sql.shuffle.partitions").toInt
      val posting0 = posting(spark).localCheckpoint(false)
      val rare = posting0.groupBy(col("__g"))
        .agg(count(lit(1)).as("__df"))
        .filter(col("__df").between(2, 400))
      val rp = posting0.join(rare.select(col("__g")), Seq("__g"))
      val kStats = rp.groupBy(pmod(hash(col("__g")), lit(nPart)).as("p"))
        .agg(count(lit(1)).as("rows"))
        .agg(max(col("rows")).as("mx"),
          expr("percentile(rows, 0.5)").as("md"), sum(col("rows")).as("tot"))
        .collect()(0)
      println(s"[opt] shjgate kernel rp build side: nPart=$nPart " +
        s"maxRows=${kStats.get(0)} medianRows=${kStats.get(1)} " +
        s"totalRows=${kStats.get(2)} maxBytes~=${kStats.getLong(0) * 48}")
      val post = graft.llm.Search.postings(
        docsWithNearDups(spark, sfDir), "text", "doc_id")
      val dfT = post.groupBy(col("term")).agg(count(lit(1)).as("df"))
        .filter(col("df") >= 2 && col("df") <= 400)
      val w = post.join(dfT, Seq("term"))
        .select(col("term"), col("doc_id"), lit(1.0).as("w"))
      val tStats = w.groupBy(pmod(hash(col("term")), lit(nPart)).as("p"))
        .agg(count(lit(1)).as("rows"),
          sum(length(col("term")) + 48L).as("bytes"))
        .agg(max(col("rows")).as("mxr"), max(col("bytes")).as("mxb"),
          expr("percentile(bytes, 0.5)").as("mdb")).collect()(0)
      println(s"[opt] shjgate tfidf w build side: nPart=$nPart " +
        s"maxRows=${tStats.get(0)} maxBytes~=${tStats.get(1)} " +
        s"medianBytes~=${tStats.get(2)}")
    }

    if (which("celf10")) {
      // q139 CELF item-table materialization A/B: persist (batch min/max
      // stats prune the per-round candidate filters) vs eager raw-row
      // checkpoint (no columnar encode/decode). Full q139 both ways.
      def q139 = () => SparkEntry.queries("q139_coverage_select")(spark, sfDir)
      def persistVar = () => {
        graft.ops.Selection.itemCkptOverride = Some(false); q139()
      }
      def ckptVar = () => {
        graft.ops.Selection.itemCkptOverride = None; q139()
      }
      try compare(3)(
        "celf10/persist (r9)" -> persistVar,
        "celf10/ckpt (default)" -> ckptVar)
      finally graft.ops.Selection.itemCkptOverride = None
    }

    if (which("assoc3")) {
      def baskets = events(spark, sfDir)
        .select(col("user_id").as("basket"),
          get_json_object(col("props"), "$.k").cast("long").as("item"))
      def rules(mat: String) = () => {
        val b0 = baskets.filter(col("item").isNotNull).distinct()
        val b = mat match {
          case "persist" =>
            b0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          case _ => b0.localCheckpoint(true)
        }
        val n = b.agg(countDistinct(col("basket")).as("n_baskets"))
        val freq = b.groupBy(col("item")).agg(count(lit(1)).as("c_item"))
          .crossJoin(broadcast(n))
          .filter(col("c_item") >= ceil(lit(0.2) * col("n_baskets")))
          .select(col("item"), col("c_item"))
        val fb = b.join(freq.select(col("item")), Seq("item"))
        val pairs = fb.select(col("basket"), col("item").as("a"))
          .join(fb.select(col("basket"), col("item").as("b")), Seq("basket"))
          .filter(col("a") < col("b"))
          .groupBy(col("a"), col("b")).agg(count(lit(1)).as("c_pair"))
          .crossJoin(broadcast(n))
          .filter(col("c_pair") >= ceil(lit(0.2) * col("n_baskets")))
        val both = pairs
          .select(explode(array(
            struct(col("a").as("antecedent"), col("b").as("consequent"),
              col("c_pair"), col("n_baskets")),
            struct(col("b").as("antecedent"), col("a").as("consequent"),
              col("c_pair"), col("n_baskets")))).as("__r"))
          .select(col("__r.antecedent").as("antecedent"),
            col("__r.consequent").as("consequent"),
            col("__r.c_pair").as("c_pair"), col("__r.n_baskets").as("n_baskets"))
        both
          .join(freq.select(col("item").as("antecedent"),
            col("c_item").as("c_ante")), Seq("antecedent"))
          .join(freq.select(col("item").as("consequent"),
            col("c_item").as("c_cons")), Seq("consequent"))
          .select(col("antecedent"), col("consequent"), col("c_pair"),
            round(col("c_pair").cast("double") / col("n_baskets"), 6)
              .as("support"),
            round(col("c_pair").cast("double") / col("c_ante"), 6)
              .as("confidence"),
            round(col("n_baskets").cast("double") * col("c_pair") /
              (col("c_ante").cast("double") * col("c_cons")), 6).as("lift"))
      }
      compare(3)(
        "assoc3/persist (current)" -> rules("persist"),
        "assoc3/ckpt" -> rules("ckpt"))
    }

    if (which("assoc")) {
      def baskets = events(spark, sfDir)
        .select(col("user_id").as("basket"),
          get_json_object(col("props"), "$.k").cast("long").as("item"))
      time("assoc/1 basket dedup") {
        baskets.filter(col("item").isNotNull).distinct()
      }
      val b = baskets.filter(col("item").isNotNull).distinct().persist()
      println(s"[opt] distinct (basket,item) rows = ${b.count()}")
      val n = b.agg(countDistinct(col("basket")).as("n_baskets"))
      val freq = b.groupBy(col("item")).agg(count(lit(1)).as("c_item"))
        .crossJoin(broadcast(n))
        .filter(col("c_item") >= ceil(lit(0.2) * col("n_baskets")))
        .select(col("item"), col("c_item"))
      println(s"[opt] frequent items = ${freq.count()}")
      val fb = b.join(freq.select(col("item")), Seq("item"))
      val cand = fb.select(col("basket"), col("item").as("a"))
        .join(fb.select(col("basket"), col("item").as("b")), Seq("basket"))
        .filter(col("a") < col("b"))
      println(s"[opt] candidate pair occurrences = ${cand.count()}")
      time("assoc/2 pair join (cached b)") {
        cand.groupBy(col("a"), col("b")).agg(count(lit(1)).as("c_pair"))
      }
      b.unpersist()
      time("assoc/3 full pairRules")(
        graft.ops.Association.pairRules(baskets, "basket", "item", 0.2))
    }

    spark.stop()
  }
}
