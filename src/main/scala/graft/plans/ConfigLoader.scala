package graft.plans

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import scala.jdk.CollectionConverters._

/** YAML config loader + behavior-test runner — the reference's
  * config-driven entry point re-expressed over [[Topology]].
  *
  * Reference: /root/reference/src/config/loading/mod.rs:144 (load →
  * compile), src/config/compiler.rs:11 (sources/transforms/sinks maps
  * with `inputs` edges), and the unit-test semantics of
  * src/unit_test.rs:163 (`insert_at` feeds synthetic events into a
  * transform, `extract_from` asserts VRL conditions on its output,
  * `no_outputs_from` asserts emptiness) as exercised by the published
  * tests/behavior/transforms/{filter,remap,dedupe,route}.yaml format.
  *
  * Spark-first: a parsed config builds the same [[Topology.Component]]
  * DAG the Scala DSL builds — transform bodies compile through
  * [[graft.functions.VrlCompiler]] to Column expressions, so a YAML
  * pipeline is still ONE Catalyst plan per sink.
  */
object ConfigLoader {
  import graft.functions.VrlCompiler

  // ---------------- YAML → components ----------------

  private def yamlMap(v: Any): Map[String, Any] = v match {
    case m: java.util.Map[_, _] =>
      m.asScala.map { case (k, x) => k.toString -> (x: Any) }.toMap
    case null => Map.empty
    case other =>
      throw new IllegalArgumentException(s"expected mapping, got $other")
  }
  private def yamlList(v: Any): List[Any] = v match {
    case l: java.util.List[_] => l.asScala.toList.map(x => x: Any)
    case s: Seq[_] => s.toList.map(x => x: Any) // scala-side defaults
    case null => Nil
    case other => List(other)
  }
  private def strList(v: Any): Seq[String] = yamlList(v).map(_.toString)

  def parseYaml(text: String): Map[String, Any] =
    yamlMap(new org.yaml.snakeyaml.Yaml().load[Any](text))

  /** The `condition:` shape — either a bare VRL string or
    * `{type: vrl, source: ...}` (src/conditions/mod.rs).
    */
  private def conditionSource(v: Any): String = v match {
    case s: String => s
    case m: java.util.Map[_, _] =>
      val mm = yamlMap(m)
      mm.getOrElse("type", "vrl") match {
        case "vrl" => mm("source").toString
        // event-kind predicates (§2.2 is_log/is_metric/is_trace) —
        // behavior inputs carry a __event_kind column; plain log streams
        // without one count as logs (the loader's default event type)
        case "is_log" => """!exists(.__event_kind) || .__event_kind == "log""""
        case "is_metric" => """.__event_kind == "metric""""
        case "is_trace" => """.__event_kind == "trace""""
        case other =>
          throw new IllegalArgumentException(s"unsupported condition type $other")
      }
    case other =>
      throw new IllegalArgumentException(s"bad condition: $other")
  }

  private def boolOpt(m: Map[String, Any], key: String, default: Boolean): Boolean =
    m.get(key).map(_.toString.toBoolean).getOrElse(default)

  /** Build one Transform component from its YAML table
    * (src/transforms/mod.rs type registry — the supported subset).
    */
  def transformOf(id: String, conf: Map[String, Any]): Topology.Transform = {
    val inputs = strList(conf.getOrElse("inputs", Nil))
    conf.getOrElse("type", "").toString match {
      case "remap" =>
        val source = conf("source").toString
        val dropOnError = boolOpt(conf, "drop_on_error", default = false)
        val dropOnAbort = boolOpt(conf, "drop_on_abort", default = true)
        Topology.Transform(id, inputs, Topology.Any, Topology.Any, df => {
          val out = VrlCompiler.runWith(df, source, dropOnError, dropOnAbort)
          Map("" -> out.primary, "dropped" -> out.dropped)
        })
      case "filter" =>
        val source = conditionSource(conf("condition"))
        Topology.Transform.simple(id, inputs, df =>
          df.filter(coalesce(VrlCompiler.condition(df.schema, source), lit(false))))
      case "route" =>
        val routes = yamlMap(conf("route")).toSeq.map { case (port, c) =>
          port -> conditionSource(c)
        }
        Topology.Transform(id, inputs, Topology.Any, Topology.Any, df => {
          val compiled = routes.map { case (p, src) =>
            p -> VrlCompiler.condition(df.schema, src)
          }
          graft.operators.Route(df, compiled)
        })
      case "exclusive_route" =>
        val routes = yamlList(conf("routes")).map(yamlMap).map { m =>
          m("name").toString -> conditionSource(m("condition"))
        }
        Topology.Transform(id, inputs, Topology.Any, Topology.Any, df => {
          val compiled = routes.map { case (p, src) =>
            p -> VrlCompiler.condition(df.schema, src)
          }
          graft.operators.Route.exclusive(df, compiled)
        })
      case "dedupe" =>
        val fieldsConf = yamlMap(conf.getOrElse("fields", null))
        val matches = strList(fieldsConf.getOrElse("match", Nil))
        Topology.Transform.simple(id, inputs, df => {
          // first-seen-wins needs a deterministic order; behavior inputs
          // carry __seq, batch tables fall back to any-representative
          if (df.columns.contains("__seq"))
            graft.operators.Dedupe(df, matches, col("__seq"))
          else graft.operators.Dedupe.any(df, matches)
        })
      case "reduce" =>
        import graft.operators.Reduce
        import org.apache.spark.sql.expressions.Window
        val groupBy = strList(conf.getOrElse("group_by", Nil))
        val strategies = yamlMap(conf.getOrElse("merge_strategies", null))
          .map { case (f, s) => f -> (s.toString match {
            case "concat" => Reduce.Concat(" ")
            case "concat_newline" => Reduce.Concat("\n")
            case "concat_raw" => Reduce.Concat("")
            case "array" => Reduce.ToArray
            case "discard" => Reduce.First
            case "retain" => Reduce.Last
            case "sum" => Reduce.Sum
            case "max" => Reduce.Max
            case "min" => Reduce.Min
            case "shortest_array" => Reduce.ShortestArray
            case "longest_array" => Reduce.LongestArray
            case "flat_unique" => Reduce.FlatUnique
            case other => throw new IllegalArgumentException(
              s"unknown merge strategy: $other")
          })}
        val startsWhen = conf.get("starts_when").map(conditionSource)
        val endsWhen = conf.get("ends_when").map(conditionSource)
        Topology.Transform.simple(id, inputs, df => {
          val ord =
            if (df.columns.contains("__seq")) col("__seq")
            else monotonically_increasing_id()
          // batch form of the reference's flush rules: starts_when opens
          // a new segment AT the matching event, ends_when closes the
          // segment AFTER it (transform.rs starts_when/ends_when) — both
          // become running counts over the per-group order
          val w = Window.partitionBy(groupBy.map(col): _*).orderBy(ord)
          val startSeg = startsWhen.map { src =>
            sum(coalesce(VrlCompiler.condition(df.schema, src), lit(false))
              .cast("long"))
              .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          }
          val endSeg = endsWhen.map { src =>
            coalesce(
              sum(coalesce(VrlCompiler.condition(df.schema, src), lit(false))
                .cast("long"))
                .over(w.rowsBetween(Window.unboundedPreceding, -1)),
              lit(0L))
          }
          val seg = (startSeg.toSeq ++ endSeg.toSeq)
            .reduceOption(_ + _).getOrElse(lit(0L))
          val segmented = df.withColumn("__seg", seg)
          // keep __seq alive as min-per-group so downstream transforms
          // and probes retain a deterministic order column
          val strats =
            if (df.columns.contains("__seq"))
              strategies + ("__seq" -> Reduce.Min)
            else strategies
          Reduce(segmented, groupBy :+ "__seg", strats, ord).drop("__seg")
        })

      case "sample" =>
        val rate = conf.getOrElse("rate", "10").toString.toInt
        val keyField = conf.get("key_field").map(_.toString)
        Topology.Transform.simple(id, inputs, df =>
          graft.operators.Sample.byKey(df,
            keyField.map(col).getOrElse(monotonically_increasing_id()), rate))
      case other =>
        throw new IllegalArgumentException(s"unsupported transform type: $other")
    }
  }

  /** Load a full topology config: sources read the driver-provided
    * parquet tables (`type: parquet`, `table: <name>`), transforms via
    * [[transformOf]], sinks become named outputs.
    */
  def load(spark: SparkSession, yaml: String, sfDir: String): Topology.Built = {
    val conf = parseYaml(yaml)
    val sources = yamlMap(conf.getOrElse("sources", null)).map { case (id, v) =>
      val m = yamlMap(v)
      m.getOrElse("type", "").toString match {
        case "parquet" | "file" =>
          val table = m.getOrElse("table", id).toString
          Topology.Source(id, Topology.Log,
            sp => graft.Graft.table(sp, sfDir, table))
        // streaming source types — the `vector --config c.yaml` shapes
        // (src/sources/{demo_logs,socket,kafka}.rs); each yields a
        // STREAMING DataFrame, and the same Topology/VRL machinery
        // applies unchanged (transforms are Column expressions)
        case "demo_logs" =>
          val fmt = m.getOrElse("format", "json").toString
          val interval = m.getOrElse("interval", "1").toString.toDouble
          val rps = math.max(1, math.round(1.0 / interval).toInt)
          Topology.Source(id, Topology.Log,
            sp => graft.streaming.StreamRunner.demoLogs(sp, rps, fmt))
        case "socket" =>
          val addr = m.getOrElse("address", "localhost:9000").toString
          val (h, p) = addr.split(":") match {
            case Array(a, b) => (a, b.toInt)
            case _ => throw new IllegalArgumentException(
              s"socket source $id: address must be host:port")
          }
          Topology.Source(id, Topology.Log,
            sp => graft.streaming.StreamRunner.socket(sp, h, p))
        case "kafka" =>
          val servers = m.getOrElse("bootstrap_servers", "").toString
          val topics = strList(m.getOrElse("topics", Nil)).mkString(",")
          Topology.Source(id, Topology.Log,
            sp => graft.streaming.StreamRunner.kafka(sp, servers, topics))
        case "text_dir" =>
          Topology.Source(id, Topology.Log,
            sp => graft.streaming.StreamRunner.textDir(
              sp, m.getOrElse("path", sfDir).toString))
        case other =>
          throw new IllegalArgumentException(s"unsupported source type: $other")
      }
    }.toSeq
    val transforms = yamlMap(conf.getOrElse("transforms", null)).map {
      case (id, v) => transformOf(id, yamlMap(v))
    }.toSeq
    val sinks = yamlMap(conf.getOrElse("sinks", null)).map { case (id, v) =>
      val m = yamlMap(v)
      Topology.Sink(id, strList(m.getOrElse("inputs", Nil)), Topology.Any)
    }.toSeq
    Topology.build(spark, sources ++ transforms ++ sinks)
  }

  // ---------------- streaming run (the vector-binary lifecycle) -------

  /** Handle on a started config: one StreamingQuery per streaming sink
    * (batch sinks have already written and carry no query).
    */
  final case class RunningConfig(
      queries: Map[String, org.apache.spark.sql.streaming.StreamingQuery]) {
    def processAllAvailable(): Unit =
      queries.values.foreach(_.processAllAvailable())
    def stopAll(): Unit =
      queries.values.foreach(q => try q.stop() catch { case _: Exception => () })
  }

  /** The full `vector --config c.yaml` lifecycle (SURVEY §3.1): parse,
    * build the component DAG (typecheck + cycle check via
    * [[Topology.build]]), then attach each sink's writer and START it.
    * Streaming sinks (rate/socket/kafka upstream) become one
    * StreamingQuery each — the reference's "one tokio task pipeline per
    * sink" maps to one Structured Streaming query per sink. Batch
    * sources write once through the same sink configs.
    *
    * Sink types (src/sinks/): console, parquet/file (`path`,
    * `partition_by`), kafka (`bootstrap_servers`, `topic`), blackhole,
    * memory (test tap, `vector tap`-style, query name = sink id).
    */
  def run(spark: SparkSession, yaml: String, sfDir: String,
          workDir: String): RunningConfig = {
    import graft.streaming.StreamRunner
    val built = load(spark, yaml, sfDir)
    val sinkConfs = yamlMap(parseYaml(yaml).getOrElse("sinks", null))
      .map { case (id, v) => id -> yamlMap(v) }
    val queries = sinkConfs.flatMap { case (id, m) =>
      val df = built.outputs(id)
      val tpe = m.getOrElse("type", "console").toString
      val intervalMs =
        (m.getOrElse("interval", "0.1").toString.toDouble * 1000).toLong
      if (df.isStreaming) {
        val writer = tpe match {
          case "console" => StreamRunner.toConsole(df, intervalMs)
          case "parquet" | "file" => StreamRunner.toParquet(df,
            m.getOrElse("path", s"$workDir/$id").toString,
            s"$workDir/.ckpt-$id",
            strList(m.getOrElse("partition_by", Nil)))
          case "kafka" => StreamRunner.toKafka(df,
            m.getOrElse("bootstrap_servers", "").toString,
            m.getOrElse("topic", id).toString, s"$workDir/.ckpt-$id")
          case "blackhole" => StreamRunner.toBlackhole(df)
          case "memory" =>
            df.writeStream.format("memory").queryName(id)
          case other => throw new IllegalArgumentException(
            s"unsupported sink type: $other")
        }
        Some(id -> StreamRunner.start(writer, intervalMs))
      } else {
        tpe match {
          case "console" => df.show(20, truncate = false)
          case "parquet" | "file" =>
            val w = df.write.mode("overwrite")
            val pb = strList(m.getOrElse("partition_by", Nil))
            (if (pb.nonEmpty) w.partitionBy(pb: _*) else w)
              .parquet(m.getOrElse("path", s"$workDir/$id").toString)
          case "blackhole" =>
            df.write.mode("overwrite").format("noop").save()
          case "memory" => df.createOrReplaceTempView(id)
          case other => throw new IllegalArgumentException(
            s"unsupported sink type: $other")
        }
        None
      }
    }
    RunningConfig(queries.toMap)
  }

  // ---------------- behavior-test runner ----------------

  final case class TestResult(name: String, failures: Seq[String]) {
    def passed: Boolean = failures.isEmpty
  }

  /** Run a behavior YAML (transforms + tests): for each test, inject the
    * `inputs` events at their `insert_at` transforms, evaluate the
    * config DAG, and check `outputs` conditions / `no_outputs_from`
    * (unit_test.rs:163 semantics).
    */
  def runBehavior(spark: SparkSession, yaml: String): Seq[TestResult] = {
    val conf = parseYaml(yaml)
    val transformConfs = yamlMap(conf.getOrElse("transforms", null))
      .map { case (id, v) => id -> yamlMap(v) }
    val tests = yamlList(conf.getOrElse("tests", Nil)).map(yamlMap)

    tests.map { t =>
      val name = t.getOrElse("name", "unnamed").toString
      val failures = Seq.newBuilder[String]

      // events per insert_at point
      val inputs = yamlList(t.getOrElse("inputs", Nil)).map(yamlMap)
      val byInsert = inputs.zipWithIndex.groupBy(_._1("insert_at").toString)

      def inputDf(rows: List[(Map[String, Any], Int)]): DataFrame = {
        val bracketed = "^(.*)\\[(\\d+)\\]$".r
        val fieldMaps = rows.map { case (m, seq) =>
          val kind = m.getOrElse("type", "log").toString
          val raw = kind match {
            // metric events: the metric table's fields become columns
            // (name, kind, tags{...}, counter{value}, ...) so VRL
            // conditions address .tags.message etc.
            case "metric" => yamlMap(m.getOrElse("metric", null))
            case _ => m.get("log_fields").map(yamlMap).getOrElse(
              Map("message" -> m.getOrElse("value", "")))
          }
          // `field[0]`-style keys assemble into an array field
          // (unit_test.rs feeds log_fields through path insertion)
          val (idx, plain) = raw.partition(kv => bracketed.matches(kv._1))
          val arrays = idx.toSeq
            .map { case (bracketed(base, i), v) => (base, i.toInt, v) }
            .groupBy(_._1)
            .map { case (base, vs) =>
              base -> vs.sortBy(_._2).map(_._3.toString)
            }
          (plain ++ arrays + ("__event_kind" -> kind), seq)
        }
        val keys = fieldMaps.flatMap(_._1.keys).distinct
        // nested YAML maps become struct columns (deterministic
        // key-sorted field order)
        def typeOf(v: Any): DataType = v match {
          case mm: java.util.Map[_, _] =>
            StructType(yamlMap(mm).toSeq.sortBy(_._1)
              .map { case (k, vv) => StructField(k, typeOf(vv)) })
          case _: java.lang.Integer | _: java.lang.Long => LongType
          case _: java.lang.Double | _: java.math.BigDecimal => DoubleType
          case _: java.lang.Boolean => BooleanType
          case _: Seq[_] => ArrayType(StringType)
          case _ => StringType
        }
        def sparkType(vs: Seq[Any]): DataType =
          if (vs.exists(_.isInstanceOf[java.util.Map[_, _]]))
            vs.collectFirst { case m: java.util.Map[_, _] => typeOf(m) }.get
          else if (vs.exists { case _: java.lang.Double | _: java.math.BigDecimal => true; case _ => false })
            DoubleType // mixed int/double columns widen (reduce_numbers)
          else vs.collectFirst {
            case _: java.lang.Integer | _: java.lang.Long => LongType
            case _: java.lang.Boolean => BooleanType
            case _: Seq[_] => ArrayType(StringType)
            case _: String => StringType
          }.getOrElse(StringType)
        def conv(vOpt: Option[Any], dt: DataType): Any = (vOpt, dt) match {
          case (None, _) => null
          case (Some(v: java.util.Map[_, _]), st: StructType) =>
            val mm = yamlMap(v)
            Row.fromSeq(st.fields.toSeq.map(f => conv(mm.get(f.name), f.dataType)))
          case (Some(v: java.lang.Integer), LongType) => v.longValue()
          case (Some(v: java.lang.Long), LongType) => v.longValue()
          case (Some(v: java.lang.Integer), DoubleType) => v.doubleValue()
          case (Some(v: java.lang.Long), DoubleType) => v.doubleValue()
          case (Some(v: java.math.BigDecimal), DoubleType) => v.doubleValue()
          case (Some(v: java.lang.Double), DoubleType) => v.doubleValue()
          case (Some(v), StringType) => v.toString
          case (Some(v), _) => v
        }
        val schema = StructType(
          keys.map(k => StructField(k,
            sparkType(fieldMaps.flatMap(_._1.get(k))))) ++
            Seq(StructField("__seq", LongType),
              // reference inserts events with log_schema timestamps
              // (unit tests assert e.g. exists(.timestamp_end))
              StructField("timestamp", TimestampType)))
        val data = fieldMaps.map { case (m, seq) =>
          Row.fromSeq(keys.map(k => conv(m.get(k), schema(k).dataType)) ++
            Seq(seq.toLong,
              new java.sql.Timestamp(1600000000000L + seq * 1000L)))
        }
        spark.createDataFrame(data.asJava, schema)
      }

      // components: one source per insert point; transforms with their
      // declared inputs, except insert_at targets read the injected
      // source and refs to undefined components resolve to nothing
      val sourceIds = byInsert.keys.toSeq
      val comps: Seq[Topology.Component] =
        sourceIds.map(id => Topology.Source(s"__in_$id", Topology.Any, {
          val df = inputDf(byInsert(id))
          _ => df
        })) ++
        transformConfs.map { case (id, tc) =>
          val base = transformOf(id, tc)
          val declared = base.inputs.filter(r =>
            transformConfs.contains(r.split("\\.", 2)(0)))
          val ins = (if (byInsert.contains(id)) Seq(s"__in_$id") else Nil) ++ declared
          base.copy(inputs = if (ins.isEmpty) Seq("__void") else ins)
        } ++
        Seq(Topology.Source("__void", Topology.Any,
          sp => sp.createDataFrame(
            new java.util.ArrayList[Row](),
            StructType(Seq(StructField("__seq", LongType))))))

      // probe sinks for every referenced output
      val outputs = yamlList(t.getOrElse("outputs", Nil)).map(yamlMap)
      val noOut = strList(t.getOrElse("no_outputs_from", Nil))
      val probeRefs = (outputs.map(_("extract_from").toString) ++ noOut).distinct
      val sinks = probeRefs.zipWithIndex.map { case (ref, i) =>
        Topology.Sink(s"__probe_$i", Seq(ref), Topology.Any)
      }
      val probeOf = probeRefs.zipWithIndex.toMap

      val built = Topology.build(spark, comps ++ sinks)

      outputs.foreach { o =>
        val ref = o("extract_from").toString
        val df = built.sink(s"__probe_${probeOf(ref)}")
        // each condition must be satisfied by at least one emitted event
        // (an output block can describe several expected events, e.g.
        // reduce.yaml's two per-group results — unit_test.rs checks each
        // condition against the collected output set)
        yamlList(o.getOrElse("conditions", Nil))
          .map(c => conditionSource(c)).foreach { src =>
            val pred =
              coalesce(VrlCompiler.condition(df.schema, src), lit(false))
            if (df.filter(pred).isEmpty)
              failures += s"no row from '$ref' matched: $src"
          }
      }
      noOut.foreach { ref =>
        val df = built.sink(s"__probe_${probeOf(ref)}")
        if (!df.isEmpty) failures += s"expected no output from '$ref'"
      }

      TestResult(name, failures.result())
    }
  }
}
