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

      case other => sys.error(s"unknown probe $other")
    }
    spark.stop()
  }
}
