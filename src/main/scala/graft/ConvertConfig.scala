package graft

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

import graft.plans.Toml

/** `vector convert-config` (reference src/convert_config.rs): convert a
  * config file — or a directory tree of them — between toml, yaml, and
  * json. Best-effort like the reference: comments are not preserved.
  * The output path must not already exist (convert_config.rs check_paths).
  *
  * Usage: ConvertConfig <input> <output> [--output-format yaml|json|toml]
  */
object ConvertConfig {

  private val Exts = Set("toml", "yaml", "yml", "json")

  def main(args: Array[String]): Unit = {
    val pos = scala.collection.mutable.ListBuffer[String]()
    var fmt = "yaml"
    var j = 0
    while (j < args.length) {
      args(j) match {
        case "--output-format" if j + 1 < args.length =>
          fmt = args(j + 1); j += 2
        case flag if flag.startsWith("--output-format=") =>
          fmt = flag.stripPrefix("--output-format="); j += 1
        case p => pos += p; j += 1
      }
    }
    require(Set("yaml", "json", "toml")(fmt), s"unknown output format: $fmt")
    val (in, out) = pos.toList match {
      case a :: b :: Nil => (Paths.get(a), Paths.get(b))
      case _ =>
        System.err.println(
          "usage: ConvertConfig <input> <output> [--output-format yaml|json|toml]")
        sys.exit(64)
    }
    if (Files.exists(out)) {
      System.err.println(
        s"Output path $out already exists. Please provide a non-existing output path.")
      sys.exit(78)
    }
    val failed =
      if (Files.isDirectory(in)) convertTree(in, out, fmt)
      else if (convertOne(in, out, fmt)) 0 else 1
    if (failed > 0) sys.exit(1)
  }

  /** Convert a directory tree; returns the failure count. Inputs sharing
    * a stem (a.toml + a.yaml) would resolve to the same output file and
    * silently clobber each other — the collision is reported instead of
    * converting either.
    */
  def convertTree(in: Path, out: Path, fmt: String): Int = {
    var failed = 0
    val files = Files.walk(in).iterator().asScala
      .filter(p => Files.isRegularFile(p) && Exts(ext(p))).toList
    val byTarget = files.groupBy(p =>
      out.resolve(swapExt(in.relativize(p).toString, fmt)))
    byTarget.toSeq.sortBy(_._1.toString).foreach {
      case (target, sources) if sources.length > 1 =>
        System.err.println(s"Failed to convert ${sources.mkString(", ")}: " +
          s"all would write $target — rename the inputs to distinct stems")
        failed += sources.length
      case (target, Seq(p)) =>
        if (!convertOne(p, target, fmt)) failed += 1
      case _ => ()
    }
    if (files.isEmpty)
      System.err.println(s"No config files (toml/yaml/json) under $in")
    failed
  }

  private def ext(p: Path): String = {
    val n = p.getFileName.toString
    val dot = n.lastIndexOf('.')
    if (dot < 0) "" else n.substring(dot + 1).toLowerCase
  }
  private def swapExt(rel: String, fmt: String): String = {
    val dot = rel.lastIndexOf('.')
    (if (dot < 0) rel else rel.substring(0, dot)) + "." + fmt
  }

  def convertOne(in: Path, out: Path, fmt: String): Boolean =
    try {
      val conf = load(in)
      if (out.getParent != null) Files.createDirectories(out.getParent)
      Files.writeString(out, render(conf, fmt))
      println(s"Converted $in -> $out")
      true
    } catch {
      case e: Exception =>
        System.err.println(s"Failed to convert $in: ${e.getMessage}")
        false
    }

  /** Parse by extension into an insertion-ordered scala tree. */
  def load(p: Path): Map[String, Any] = ext(p) match {
    case "toml" => Toml.parse(Files.readString(p))
    // JSON ⊂ YAML: both go through the same loader (config/format.rs
    // treats them as sibling serde formats)
    case "yaml" | "yml" | "json" =>
      deepScala(new org.yaml.snakeyaml.Yaml()
        .load[Any](Files.readString(p))) match {
        case m: Map[String @unchecked, Any @unchecked] => m
        case other => throw new IllegalArgumentException(
          s"top level must be a mapping, got $other")
      }
    case e => throw new IllegalArgumentException(s"unsupported extension .$e")
  }

  def render(conf: Map[String, Any], fmt: String): String = fmt match {
    case "toml" => Toml.render(conf)
    case "yaml" =>
      val opts = new org.yaml.snakeyaml.DumperOptions
      opts.setDefaultFlowStyle(
        org.yaml.snakeyaml.DumperOptions.FlowStyle.BLOCK)
      opts.setIndent(2)
      new org.yaml.snakeyaml.Yaml(opts).dump(deepJava(conf))
    case "json" =>
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      mapper.writerWithDefaultPrettyPrinter()
        .writeValueAsString(deepJava(conf)) + "\n"
  }

  private def deepScala(v: Any): Any = v match {
    case m: java.util.Map[_, _] =>
      scala.collection.immutable.VectorMap.from(
        m.asScala.map { case (k, x) => k.toString -> deepScala(x) })
    case l: java.util.List[_] => l.asScala.map(deepScala).toList
    case other => other
  }
  private def deepJava(v: Any): Any = v match {
    case m: Map[_, _] =>
      val jm = new java.util.LinkedHashMap[String, Any]()
      m.foreach { case (k, x) => jm.put(k.toString, deepJava(x)) }
      jm
    case l: Seq[_] =>
      val jl = new java.util.ArrayList[Any]()
      l.foreach(x => jl.add(deepJava(x)))
      jl
    case other => other
  }
}
