package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interleaved same-JVM A/B harness for perf candidates (the only
  * trustworthy way to measure on this host — back-to-back runs swing
  * 30%+; see BENCH_NOTES). Usage:
  *   tools/run.sh graft.AbProbe <sfDir> <probe> [rep] [rounds]
  * Prints per-round A/B seconds and medians; asserts A and B outputs
  * are identical before timing.
  */
object AbProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val probe = args(1)
    val rep = if (args.length > 2) args(2).toInt else 40
    val rounds = if (args.length > 3) args(3).toInt else 5
    val spark = Graft.session()
    import spark.implicits._

    def replicated(): DataFrame = {
      val cpus = Runtime.getRuntime.availableProcessors()
      Graft.table(spark, sfDir, "events")
        .repartition(cpus * 2)
        .withColumn("__r", explode(sequence(lit(0), lit(rep - 1))))
        .withColumn("event_id", col("event_id") * rep + col("__r"))
        .drop("__r")
    }

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def noop(df: DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.length % 2 == 1) s(s.length / 2)
      else (s(s.length / 2 - 1) + s(s.length / 2)) / 2
    }

    def ab(mkA: () => DataFrame, mkB: () => DataFrame,
           check: Boolean = true): Unit = {
      if (check) {
        val ha = mkA().orderBy(mkA().columns.map(col).toSeq: _*)
          .collect().map(_.toString).mkString("\n").hashCode
        val hb = mkB().orderBy(mkB().columns.map(col).toSeq: _*)
          .collect().map(_.toString).mkString("\n").hashCode
        require(ha == hb, "A and B outputs differ!")
        println("outputs identical")
      }
      noop(mkA()); noop(mkB()) // warm both plans
      val as = Seq.newBuilder[Double]
      val bs = Seq.newBuilder[Double]
      (1 to rounds).foreach { r =>
        val ta = time(noop(mkA()))
        val tb = time(noop(mkB()))
        as += ta; bs += tb
        println(f"round $r: A=$ta%.3f s  B=$tb%.3f s")
      }
      println(f"median A=${median(as.result())}%.3f s  " +
        f"B=${median(bs.result())}%.3f s")
    }

    probe match {
      case "cef" =>
        // A: 6-escaped-group regex header scan; B: hand scanner
        def line(df: DataFrame) = {
          val k = Graft.jsonLong(col("props"), "k")
          graft.codecs.Encode.cef("graft", "engine", "1.0",
            signatureId = k, name = col("event_type"),
            severity = pmod(k, lit(10)),
            extensions = Seq(
              "suser" -> concat(lit("u"), col("user_id")),
              "msg" -> concat(col("event_type"), lit(" at "), k)))
        }
        def outOf(tok: org.apache.spark.sql.Column => org.apache.spark.sql.Column)
            : DataFrame = {
          val df = replicated()
          val base = df.withColumn("__g", tok(line(df)))
          base.select(col("event_id"),
            graft.functions.Vrl.parseCefFrom(col("__g")).as("p"))
            .select(col("event_id"),
              col("p.event_class_id").cast("long").as("id"),
              col("p.name").as("name"),
              element_at(col("p.extensions"), "msg").as("msg"))
        }
        ab(() => outOf(graft.functions.Vrl.cefTokens),
           () => outOf(graft.functions.CefTokens.apply))

      case "pipeline_oha" =>
        // A: default objectHashAggregate fallback threshold (128);
        // B: raised threshold — does the pipeline's collect_list agg
        // fall back to sort-based aggregation and pay for it?
        def run(threshold: String): Double = {
          spark.conf.set(
            "spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
            threshold)
          time(noop(Queries.eventsPipeline(replicated())))
        }
        noop(Queries.eventsPipeline(replicated())) // warm
        val as = Seq.newBuilder[Double]
        val bs = Seq.newBuilder[Double]
        (1 to rounds).foreach { r =>
          val ta = run("128")
          val tb = run("4000000")
          as += ta; bs += tb
          println(f"round $r: A(128)=$ta%.3f s  B(4M)=$tb%.3f s")
        }
        println(f"median A=${median(as.result())}%.3f s  " +
          f"B=${median(bs.result())}%.3f s")

      case "pipeline_parts" =>
        // cost breakdown of the gating shape: full pipeline vs the same
        // agg without the collect_list msgs column vs remap-only
        def agg(withMsgs: Boolean)(df: DataFrame): DataFrame = {
          val base = Queries.eventsRemap(df)
            .groupBy(col("user_id"), to_date(col("ts")).as("__day"))
          val common = Seq(
            count(lit(1)).as("n_events"),
            round(sum(col("value")), 2).as("total_value"),
            sum(col("k")).as("sum_k"),
            min_by(col("event_type"), col("event_id")).as("first_type"),
            array_join(array_sort(collect_set(col("event_type"))), ",")
              .as("types"))
          val msgs = concat_ws("|",
            transform(
              array_sort(collect_list(struct(col("event_id"), col("msg")))),
              x => x.getField("msg"))).as("msgs")
          if (withMsgs) base.agg(common.head, (common.tail :+ msgs): _*)
          else base.agg(common.head, common.tail: _*)
        }
        noop(agg(true)(replicated())); noop(agg(false)(replicated()))
        noop(Queries.eventsRemap(replicated()))
        (1 to rounds).foreach { r =>
          val tFull = time(noop(agg(true)(replicated())))
          val tNoMsgs = time(noop(agg(false)(replicated())))
          val tRemap = time(noop(Queries.eventsRemap(replicated())))
          println(f"round $r: full=$tFull%.3f  no_msgs=$tNoMsgs%.3f  " +
            f"remap_only=$tRemap%.3f")
        }

      case "pipeline_daykey" =>
        // A: to_date(ts) group key (calendar conversion per row);
        // B: integer epoch-day key (pure division under UTC), date
        // rendered once per group at the end
        def shape(dayKey: Boolean)(df: DataFrame): DataFrame = {
          val remapped = Queries.eventsRemap(df)
          val keyed =
            if (!dayKey) remapped.groupBy(col("user_id"),
              to_date(col("ts")).as("__day"))
            else remapped.groupBy(col("user_id"),
              floor(unix_micros(col("ts")) / 86400000000L).as("__day"))
          val aggd = keyed.agg(
            count(lit(1)).as("n_events"),
            round(sum(col("value")), 2).as("total_value"),
            sum(col("k")).as("sum_k"),
            min_by(col("event_type"), col("event_id")).as("first_type"),
            array_join(array_sort(collect_set(col("event_type"))), ",")
              .as("types"),
            concat_ws("|", transform(
              array_sort(collect_list(struct(col("event_id"), col("msg")))),
              x => x.getField("msg"))).as("msgs"))
          val day =
            if (!dayKey) date_format(col("__day"), "yyyy-MM-dd")
            else date_format(date_from_unix_date(col("__day").cast("int")),
              "yyyy-MM-dd")
          aggd.select(col("user_id"), day.as("day"), col("n_events"),
            col("total_value"), col("sum_k"), col("first_type"),
            col("types"), col("msgs"))
        }
        ab(() => shape(false)(replicated()),
           () => shape(true)(replicated()))

      case "pipeline_vs_remap" =>
        // Ratio pin for the GATING unstructured-pipeline class vs
        // remap-only — the one headline with no in-JVM pin until r16
        // (the r15 official bench read it 0.18 on a throttled host vs
        // the stable 0.45; adjudication needed a full bench re-run).
        // The official Bench now interleaves these two shapes itself
        // and ships pipeline_vs_remap_ratio; this case reproduces the
        // pin standalone for adjudication at any rep/rounds.
        ab(() => Queries.eventsPipeline(replicated()),
           () => Queries.eventsRemap(replicated()),
           check = false) // different shapes by design

      case "structured_vs_remap" =>
        // Ratio pin for the structured-transcode class (json -> typed ->
        // json), the one headline class that had no interleaved pin:
        // r13's official bench read −14% per-effective-core on a faster
        // host with zero code changes on the path. A = structured
        // transcode, B = remap-only, alternating in ONE JVM.
        ab(() => Queries.eventsStructured(replicated()),
           () => Queries.eventsRemap(replicated()),
           check = false) // different shapes by design

      case "metrics_vs_remap" =>
        // Not an optimization A/B: pins the metrics class's throughput
        // RELATIVE to remap-only in ONE interleaved JVM, so official-
        // bench host swings (r11 saw −24% official vs +19% local on
        // this class with zero code change) can be adjudicated against
        // a stable ratio instead of two absolute numbers from
        // different sessions. A = metrics fan-out+agg, B = remap-only.
        ab(() => Queries.metricsPipeline(replicated()),
           () => Queries.eventsRemap(replicated()),
           check = false) // different shapes by design

      case "bpe_stage" =>
        // Not an A/B: splits Bpe.train's cost into its two stages at
        // the given rep — the distributed word-frequency count vs the
        // driver-side merge loop — to localize the r12 stress finding
        // (train 3.6 s at 2M docs -> 186.6 s at 10M).
        val docs = Graft.table(spark, sfDir, "documents")
          .withColumn("__r", explode(sequence(lit(0), lit(rep - 1))))
          .withColumn("doc_id", col("doc_id") * rep + col("__r"))
          .withColumn("text",
            concat(col("text"), lit(" v"), pmod(col("__r"), lit(97))))
          .drop("__r")
          .cache()
        println(s"corpus: ${docs.count()} docs")
        val pretok = udf((s: String) =>
          if (s == null) Array.empty[String]
          else graft.datapipe.Bpe.preTokenize(s).toArray)
        (1 to rounds).foreach { r =>
          val tCount = time {
            val n = docs.select(explode(pretok(col("text"))).as("w"))
              .groupBy("w").agg(count(lit(1)).as("n"))
              .orderBy(col("n").desc, col("w")).limit(50000)
              .collect().length
            println(s"  freq table: $n words")
          }
          val tTrain = time {
            graft.datapipe.Bpe.train(docs, col("text"), numMerges = 200)
          }
          println(f"round $r: count=$tCount%.1f s  train_total=$tTrain%.1f s" +
            f"  driver_loop≈${tTrain - tCount}%.1f s")
        }

      case "egress_udfs" =>
        // Close-out of the r12 verdict note: the only non-codegen steps
        // on the dd-metrics / remote-write egress are the toSketch and
        // sketchQs per-row UDFs. A = the real path; B = the same rows
        // through pure-codegen HOFs of the same per-row width (the
        // ceiling a Catalyst-expression port could reach). The A/B gap
        // bounds what a port would buy on a path that carries every
        // distribution/histogram row.
        // The generators below lean on nested transform()/struct()
        // HOFs, which run INTERPRETED — at rep=40 building the corpus
        // costs minutes per pass and drowns the A/B signal. So each
        // corpus is materialized to parquet ONCE and both legs read it
        // back: the timed passes then isolate exactly the
        // UDF-vs-codegen egress work.
        val egressBase = java.nio.file.Files
          .createTempDirectory("ab-egress").toString
        replicated()
          .select(
            concat(lit("m"), pmod(col("event_id"), lit(1000))).as("name"),
            lit("distribution").as("value_type"),
            col("ts").as("timestamp"),
            map(lit("host"), lit("h1"), lit("env"), lit("prod")).as("tags"),
            transform(sequence(lit(0), lit(63)), i =>
              struct(
                (pmod(col("event_id") + i * lit(37), lit(10000)) / lit(10.0)
                  + lit(0.1)).as("value"),
                (pmod(i, lit(5)) + 1).cast("long").as("rate")))
              .as("dist_samples"))
          .write.mode("overwrite").parquet(s"$egressBase/dist")
        def distRows(): DataFrame = spark.read.parquet(s"$egressBase/dist")
        val nRows = distRows().count()
        println(s"egress corpus: $nRows rows x 64 samples")
        // A: real dd sketch fragment (native toSketch + proto-encode
        // expressions since the r14 ports; originally Scala UDFs)
        def ddA(): DataFrame = {
          val df = distRows()
          df.select(graft.sinks.DdMetrics.sketchFragment(df).as("b"))
            .filter(col("b").isNotNull)
        }
        // B: codegen ceiling — same array scanned by HOFs (ddsketch-ish
        // key per sample via log(), count/sum/min/max folds), no UDF
        def ddB(): DataFrame = {
          val gamma = 1.0 / math.log(1.015625)
          distRows().select(
            aggregate(col("dist_samples"), lit(0L),
              (a, s) => a + s.getField("rate")).as("cnt"),
            aggregate(col("dist_samples"), lit(0.0),
              (a, s) => a + s.getField("value") * s.getField("rate"))
              .as("sum"),
            array_min(transform(col("dist_samples"),
              _.getField("value"))).as("min"),
            array_max(transform(col("dist_samples"),
              _.getField("value"))).as("max"),
            transform(col("dist_samples"), s =>
              ceil(log(s.getField("value")) * gamma).cast("long")).as("ks"),
            transform(col("dist_samples"), _.getField("rate")).as("ns"))
            .filter(col("cnt") > 0)
        }
        println("-- dd sketchFragment (A = real egress path, B = codegen ceiling)")
        ab(ddA _, ddB _, check = false) // different shapes by design
        // remote-write quantile lanes: A = sketchQs UDF (via
        // remoteWriteSeries over sketch rows), B = codegen quantile-ish
        // scan of the same lanes
        replicated()
          .select(
            concat(lit("s"), pmod(col("event_id"), lit(1000))).as("name"),
            lit("sketch").as("value_type"),
            col("ts").as("timestamp"),
            map(lit("env"), lit("prod")).as("tags"),
            sequence(lit(1400L), lit(1527L)).as("sketch_k"),
            transform(sequence(lit(1), lit(128)),
              i => (pmod(i * 13, lit(9)) + 1).cast("long")).as("sketch_n"),
            lit(640L).as("sketch_cnt"), lit(0.5).as("sketch_min"),
            lit(99.5).as("sketch_max"), lit(3200.0).as("sketch_sum"),
            lit(5.0).as("sketch_avg"))
          .write.mode("overwrite").parquet(s"$egressBase/sketch")
        def sketchRows(): DataFrame =
          spark.read.parquet(s"$egressBase/sketch")
        def rwA(): DataFrame =
          graft.sinks.Envelopes.remoteWriteSeries(sketchRows())
        def rwB(): DataFrame = sketchRows().select(
          col("name"),
          transform(sequence(lit(1), lit(5)), q =>
            aggregate(zip_with(col("sketch_k"), col("sketch_n"),
              (k, n) => k * n), lit(0L), (a, x) => a + x) * q).as("qs"))
        println("-- remote_write sketch quantiles (A = real egress path, " +
          "B = codegen ceiling)")
        ab(rwA _, rwB _, check = false)

      case "transport_vs_remap" =>
        // Ratio pin for the driver-side single-listener transport
        // classes (grpc pair, otlp http/grpc): measured INTERLEAVED
        // with remap-only in one JVM, so official-bench host swings on
        // these classes adjudicate against a stable ratio instead of
        // absolute numbers from different sessions (the same treatment
        // that retired the metrics-class adjudication in r12).
        val remapRows = replicated().count().toDouble
        def remapRate(): Double = {
          val t = time(noop(Queries.eventsRemap(replicated())))
          remapRows / t
        }
        def grpcPairRate(total: Int): Double = {
          val src = new graft.streaming.Grpc.VectorPushSource(spark, 0,
            "127.0.0.1")
          try {
            val port = src.boundPort
            val payload =
              """{"message":"bench event payload 0123456789","level":"info","n":7}"""
            val events = Vector.fill(500)(payload)
            val threads = 4
            val perThread = total / (threads * 500)
            val t0 = System.nanoTime()
            val ts = (1 to threads).map(_ => new Thread(() =>
              (1 to perThread).foreach(_ =>
                graft.streaming.Grpc.pushEvents("127.0.0.1", port, events))))
            ts.foreach(_.start()); ts.foreach(_.join())
            val q = src.df.writeStream.format("noop").start()
            var n = 0L
            val deadline = t0 + 120L * 1000000000L
            while (n < total && System.nanoTime() < deadline) {
              q.processAllAvailable()
              n = q.recentProgress.map(_.numInputRows).sum
            }
            val secs = (System.nanoTime() - t0) / 1e9
            q.stop()
            require(n >= total, s"grpc pair drained $n/$total")
            total / secs
          } finally src.stop()
        }
        def otlpRates(total: Int): (Double, Double) = {
          import org.apache.spark.sql.Row
          import graft.codecs.ProtobufCodec
          def sRow(schema: ProtobufCodec.ProtoSchema, vals: Any*): Row =
            new org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema(
              vals.toArray, schema.sparkType)
          val perReq = 100
          val lrS = ProtobufCodec.Otlp.LogRecord
          val records = (0 until perReq).map(i =>
            sRow(lrS, 1700000000000000000L + i, 9L, "INFO",
              sRow(ProtobufCodec.Otlp.AnyValue, s"bench otlp record $i"),
              0L, Array.emptyByteArray, Array.emptyByteArray, 0L))
          val req = ProtobufCodec.encodeTo(
            ProtobufCodec.Otlp.ExportLogsServiceRequest,
            sRow(ProtobufCodec.Otlp.ExportLogsServiceRequest,
              Seq(sRow(ProtobufCodec.Otlp.ResourceLogs,
                Seq(sRow(ProtobufCodec.Otlp.ScopeLogs, records, "")), ""))))
          def drain(src: graft.streaming.StreamRunner.OtlpHttpSource,
                    t0: Long, reqs: Int): Double = {
            val q = src.df.writeStream.format("noop").start()
            // numInputRows counts SOURCE rows — one binary Export
            // payload per request from the MemoryStream — not the
            // perReq log records the downstream explode produces
            // (verified empirically: a 200-request drain reports
            // exactly 200). The drain target is therefore reqs.
            val want = reqs.toLong
            var n = 0L
            val deadline = t0 + 120L * 1000000000L
            while (n < want && System.nanoTime() < deadline) {
              q.processAllAvailable()
              n = q.recentProgress.map(_.numInputRows).sum
            }
            val secs = (System.nanoTime() - t0) / 1e9
            q.stop()
            require(n >= want, s"otlp drained $n/$want requests")
            total / secs
          }
          val httpRate = {
            val src = graft.streaming.StreamRunner.otlpHttp(spark, 0)
            try {
              val url = new java.net.URI(
                s"http://127.0.0.1:${src.boundPort}/v1/logs").toURL
              val t0 = System.nanoTime()
              val reqs = total / perReq
              val threads = 4
              val ts = (1 to threads).map(_ => new Thread(() =>
                (1 to reqs / threads).foreach { _ =>
                  val c = url.openConnection()
                    .asInstanceOf[java.net.HttpURLConnection]
                  c.setRequestMethod("POST"); c.setDoOutput(true)
                  c.setRequestProperty("Content-Type",
                    "application/x-protobuf")
                  c.getOutputStream.write(req)
                  c.getInputStream.readAllBytes()
                  c.disconnect()
                }))
              ts.foreach(_.start()); ts.foreach(_.join())
              drain(src, t0, reqs)
            } finally src.stop()
          }
          val grpcRate = {
            val src = graft.streaming.StreamRunner.otlpHttp(spark, 0,
              Some(0), "127.0.0.1")
            try {
              val gp = src.grpcBoundPort.get
              val t0 = System.nanoTime()
              val reqs = total / perReq
              val threads = 4
              val ts = (1 to threads).map(_ => new Thread(() =>
                (1 to reqs / threads).foreach(_ =>
                  graft.streaming.Grpc.call("127.0.0.1", gp,
                    "/opentelemetry.proto.collector.logs.v1.LogsService/Export",
                    req))))
              ts.foreach(_.start()); ts.foreach(_.join())
              drain(src, t0, reqs)
            } finally src.stop()
          }
          (httpRate, grpcRate)
        }
        // warm every path once
        noop(Queries.eventsRemap(replicated()))
        grpcPairRate(50000); otlpRates(20000)
        val rs = Seq.newBuilder[(Double, Double, Double, Double)]
        (1 to rounds).foreach { r =>
          val rr = remapRate()
          val gp = grpcPairRate(100000)
          val (oh, og) = otlpRates(50000)
          rs += ((rr, gp, oh, og))
          println(f"round $r: remap=${rr / 1e6}%.2fM ev/s  " +
            f"grpc_pair=${gp / 1e3}%.1fk (${gp / rr}%.4f)  " +
            f"otlp_http=${oh / 1e3}%.1fk (${oh / rr}%.4f)  " +
            f"otlp_grpc=${og / 1e3}%.1fk (${og / rr}%.4f)")
        }
        val all = rs.result()
        def med(f: ((Double, Double, Double, Double)) => Double): Double =
          median(all.map(f))
        val mr = med(_._1)
        println(f"medians: remap=${mr / 1e6}%.2fM ev/s  " +
          f"grpc_pair/remap=${med(_._2) / mr}%.4f  " +
          f"otlp_http/remap=${med(_._3) / mr}%.4f  " +
          f"otlp_grpc/remap=${med(_._4) / mr}%.4f")

      case "vrl3_parts" =>
        // cost breakdown of vrl_parse_logs3's four parse families on a
        // REP-amplified input: which of klog regex / ALB regex /
        // cloudwatch from_json / parse_tokens dominates?
        import graft.functions.Vrl
        def in(): DataFrame = replicated()
        def kline(df: DataFrame) = {
          val lvl = element_at(
            array(lit("I"), lit("W"), lit("E"), lit("F")),
            pmod(col("user_id"), lit(4)).cast("int") + 1)
          val k = Graft.jsonLong(col("props"), "k")
          concat(lvl, lit("1011 14:32:52.123456  "), k,
            lit(" main"), col("user_id"), lit(".go:"), pmod(k, lit(100)),
            lit("] "), col("event_type"), lit(" done"))
        }
        def albLine(df: DataFrame) = {
          val k = Graft.jsonLong(col("props"), "k")
          concat(
            lit("https 2022-10-11T14:32:52.000000Z app/lb/1 10.0.0."),
            pmod(col("user_id"), lit(256)), lit(":"),
            lit(10000) + pmod(k, lit(50000)),
            lit(" 10.0.1.5:80 0.001 0.002 0.000 "),
            lit(200) + pmod(k, lit(4)),
            lit(" 200 "), k, lit(" "), k * 2,
            lit(" \"GET https://example.com:443/p/"), k,
            lit(" HTTP/2.0\" \"Mozilla/5.0 UA"), col("user_id"),
            lit("\" ECDHE-RSA-AES128-GCM-SHA256 TLSv1.2 arn:tg/"),
            col("user_id"), lit(" \"Root=1-"), k,
            lit("\" \"example.com\" \"arn:cert\" "),
            pmod(col("user_id"), lit(10)),
            lit(" 2022-10-11T14:32:52.000000Z \"forward\" \"-\" \"-\""))
        }
        def cwLine(df: DataFrame) = {
          val k = Graft.jsonLong(col("props"), "k")
          concat(
            lit("{\"owner\":\"111122223333\",\"messageType\":\"DATA_MESSAGE\"," +
              "\"logGroup\":\"g"), pmod(col("user_id"), lit(5)),
            lit("\",\"logStream\":\"s"), col("user_id"),
            lit("\",\"subscriptionFilters\":[\"f0\",\"f"),
            pmod(col("user_id"), lit(3)),
            lit("\"],\"logEvents\":[{\"id\":\"e"), k,
            lit("\",\"timestamp\":"), lit(1600000000000L) + k,
            lit(",\"message\":\"m-"), col("event_type"), lit("\"}]}"))
        }
        def base(): DataFrame =
          in().select(col("event_id"), length(kline(in())).as("l1"),
            length(albLine(in())).as("l2"), length(cwLine(in())).as("l3"))
        def klogOnly(): DataFrame = {
          val df = in()
          df.select(col("event_id"),
            Vrl.parseKlogFrom(Vrl.klogTokens(kline(df))).as("p"))
        }
        def albOnly(): DataFrame = {
          val df = in()
          df.select(col("event_id"),
            Vrl.parseAwsAlbLogFrom(Vrl.albTokens(albLine(df))).as("p"))
        }
        def cwOnly(): DataFrame = {
          val df = in()
          df.select(col("event_id"),
            Vrl.parseCloudwatchSubscription(cwLine(df)).as("p"))
        }
        def toksOnly(): DataFrame = {
          val df = in()
          val k = Graft.jsonLong(col("props"), "k")
          df.select(col("event_id"),
            Vrl.parseTokens(concat(
              lit("start \"quo ted "), col("user_id"), lit("\" [br "),
              k, lit("] tail"))).as("p"))
        }
        def cwConcatOnly(): DataFrame = {
          val df = in()
          df.select(col("event_id"), length(cwLine(df)).as("l"))
        }
        def cwFields(): DataFrame = {
          // the real query's access pattern: withColumn + 8 getField
          val df = in().withColumn("__cw",
            Vrl.parseCloudwatchSubscription(cwLine(in())))
          df.select(col("event_id"),
            col("__cw").getField("owner").as("cw_owner"),
            col("__cw").getField("message_type").as("cw_type"),
            col("__cw").getField("log_group").as("cw_group"),
            col("__cw").getField("log_stream").as("cw_stream"),
            size(col("__cw").getField("subscription_filters")).cast("long")
              .as("cw_nfilters"),
            element_at(col("__cw").getField("log_events"), 1)
              .getField("id").as("cw_eid"),
            unix_millis(element_at(col("__cw").getField("log_events"), 1)
              .getField("timestamp")).as("cw_ets"),
            element_at(col("__cw").getField("log_events"), 1)
              .getField("message").as("cw_emsg"))
        }
        def cwSingleEval(): DataFrame = {
          // candidate: parse ONCE, rebuild the renamed struct through a
          // lambda binding instead of N getField copies of the parse
          val df = in()
          val parsed = from_json(cwLine(df), lit(
            "STRUCT<owner: STRING, messageType: STRING, logGroup: STRING, " +
              "logStream: STRING, subscriptionFilters: ARRAY<STRING>, " +
              "logEvents: ARRAY<STRUCT<id: STRING, timestamp: BIGINT, " +
              "message: STRING>>>"))
          val bound = element_at(transform(array(parsed), p => struct(
            p.getField("owner").as("owner"),
            p.getField("messageType").as("message_type"),
            p.getField("logGroup").as("log_group"),
            p.getField("logStream").as("log_stream"),
            p.getField("subscriptionFilters").as("subscription_filters"),
            transform(p.getField("logEvents"), e => struct(
              e.getField("id").as("id"),
              timestamp_millis(e.getField("timestamp")).as("timestamp"),
              e.getField("message").as("message"))).as("log_events"))), 1)
          df.select(col("event_id"), bound.as("p"))
        }
        Seq[(String, () => DataFrame)](
          "concat_base" -> (() => base()),
          "klog" -> (() => klogOnly()),
          "alb" -> (() => albOnly()),
          "cw_concat" -> (() => cwConcatOnly()),
          "cw_json" -> (() => cwOnly()),
          "cw_json1" -> (() => cwSingleEval()),
          "cw_fields" -> (() => cwFields()),
          "tokens" -> (() => toksOnly())).foreach { case (nm, mk) =>
          noop(mk()) // warm
          val ts = (1 to rounds).map(_ => time(noop(mk())))
          println(f"vrl3 $nm%-12s median=${median(ts)}%.3f s " +
            ts.map(t => f"$t%.3f").mkString(" "))
        }

      case "vrlmisc_parts" =>
        // cost breakdown of vrl_misc's helper families
        import graft.functions.Vrl
        def in(): DataFrame = replicated()
        def k = Graft.jsonLong(col("props"), "k")
        def ip4 = concat(lit("10.0."), pmod(col("user_id"), lit(256)),
          lit("."), pmod(k, lit(250)) + 1)
        def v6lit = concat(lit("2001:db8::"),
          lower(conv(pmod(k, lit(256)).cast("string"), 10, 16)))
        def baseOnly(): DataFrame =
          in().select(col("event_id"), length(ip4).as("a"),
            length(v6lit).as("b"))
        def syslogOnly(): DataFrame = {
          val sev = pmod(col("user_id"), lit(8))
          val fac = pmod(col("user_id"), lit(24))
          val lvl = Vrl.toSyslogLevel(sev)
          in().select(col("event_id"), lvl.as("lvl"),
            Vrl.toSyslogSeverity(lvl).as("sev_rt"),
            Vrl.toSyslogFacility(fac).as("fac"))
        }
        def ipStrOnly(): DataFrame =
          in().select(col("event_id"), Vrl.ipToIpv6(ip4).as("v6"),
            Vrl.ipv6ToIpv4(Vrl.ipToIpv6(ip4)).as("rt4"))
        def ptonOnly(): DataFrame =
          in().select(col("event_id"),
            lower(hex(Vrl.ipPton(ip4))).as("p4hex"),
            lower(hex(Vrl.ipPton(v6lit))).as("p6hex"),
            Vrl.ipNtop(Vrl.ipPton(ip4)).as("ntop_rt"))
        def matchOnly(): DataFrame =
          in().select(col("event_id"),
            array_join(Vrl.compactArr(
              array(col("event_type"), lit(null).cast("string"), lit(""),
                lit("x"))), ",").as("cjoin"),
            Vrl.matchAny(col("event_type"), Seq("^err", "^pur")).as("many"),
            Vrl.matchArray(split(concat(col("event_type"), lit(" xray")), " "),
              "^x").as("marr"),
            Vrl.formatInt(k, 16).as("f16"),
            Vrl.formatInt(col("user_id"), 2).as("f2"),
            Vrl.isNullish(nullif(col("event_type"), lit("error"))).as("nsh"))
        def ipChkOnly(): DataFrame =
          in().select(col("event_id"),
            Vrl.isIpv4Str(ip4).as("ip4ok"),
            Vrl.isIpv4Str(concat(lit("10.0.0."),
              lit(300) + pmod(k, lit(10)))).as("ip4bad"),
            Vrl.isIpv6Str(v6lit).as("ip6ok"))
        def jsonOnly(): DataFrame =
          in().select(col("event_id"),
            try_parse_json(col("props")).isNotNull.as("isj"),
            try_parse_json(col("event_type")).isNotNull.as("isj2"))
        def jsonNative(): DataFrame =
          in().select(col("event_id"),
            graft.functions.JsonValidate(col("props")).as("isj"),
            graft.functions.JsonValidate(col("event_type")).as("isj2"))
        Seq[(String, () => DataFrame)](
          "base" -> (() => baseOnly()),
          "json_nat" -> (() => jsonNative()),
          "syslog" -> (() => syslogOnly()),
          "ip_str" -> (() => ipStrOnly()),
          "pton_udf" -> (() => ptonOnly()),
          "match_fmt" -> (() => matchOnly()),
          "ip_chk" -> (() => ipChkOnly()),
          "json" -> (() => jsonOnly())).foreach { case (nm, mk) =>
          noop(mk())
          val ts = (1 to rounds).map(_ => time(noop(mk())))
          println(f"vrlmisc $nm%-10s median=${median(ts)}%.3f s " +
            ts.map(t => f"$t%.3f").mkString(" "))
        }

      case "throttle_vs_remap" =>
        // Same ratio-pin treatment for the streaming GCRA throttle
        // class (swung ±30% across rounds with git-identical code).
        import spark.implicits._
        val remapRows = replicated().count().toDouble
        def remapRate(): Double = {
          val t = time(noop(Queries.eventsRemap(replicated())))
          remapRows / t
        }
        def throttleRate(total: Int, keys: Int): Double = {
          val base = java.nio.file.Files
            .createTempDirectory("ab-stream").toString
          spark.range(total)
            .select((col("id") % keys).cast("int").as("_1"),
              col("id").as("_2"))
            .repartition(Runtime.getRuntime.availableProcessors())
            .write.mode("overwrite").parquet(s"$base/in")
          val ds = spark.readStream
            .schema("_1 INT, _2 BIGINT").parquet(s"$base/in")
            .as[(Int, Long)]
          val out = graft.streaming.StatefulKernels.throttle[Int, (Int, Long)](
            ds.groupByKey(_._1),
            threshold = 100, windowMs = 1000L, eventTimeMs = _._2)
          val t0 = System.nanoTime()
          val q = out.writeStream.format("noop")
            .option("checkpointLocation", s"$base/ckpt")
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .start()
          var processed = 0L
          val seen = scala.collection.mutable.Set.empty[Long]
          val deadline = t0 + 300L * 1000000000L
          while (processed < total && System.nanoTime() < deadline) {
            var fresh = false
            q.recentProgress.foreach { p =>
              if (seen.add(p.batchId)) {
                processed += p.numInputRows; fresh = true
              }
            }
            if (!fresh) Thread.sleep(20)
          }
          val secs = (System.nanoTime() - t0) / 1e9
          q.stop()
          require(processed >= total, s"drained $processed/$total")
          total / secs
        }
        noop(Queries.eventsRemap(replicated()))
        throttleRate(100000, 1000) // warm state-store + codegen
        val trs = Seq.newBuilder[(Double, Double)]
        (1 to rounds).foreach { r =>
          val rr = remapRate()
          val tr = throttleRate(2000000, 10000)
          trs += ((rr, tr))
          println(f"round $r: remap=${rr / 1e6}%.2fM ev/s  " +
            f"throttle=${tr / 1e3}%.1fk ev/s  ratio=${tr / rr}%.4f")
        }
        val tall = trs.result()
        println(f"medians: remap=${median(tall.map(_._1)) / 1e6}%.2fM  " +
          f"throttle=${median(tall.map(_._2)) / 1e3}%.1fk  " +
          f"throttle/remap=${median(tall.map(_._2)) / median(tall.map(_._1))}%.4f")

      case other => sys.error(s"unknown probe $other")
    }
    spark.stop()
  }
}
