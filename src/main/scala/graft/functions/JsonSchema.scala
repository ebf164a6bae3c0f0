package graft.functions

import scala.collection.mutable.ArrayBuffer
import scala.jdk.CollectionConverters._

/** Minimal JSON Schema validator (draft 2020-12 subset) over [[JsonLite]]
  * values, backing VRL's `validate_json_schema` (published in vector
  * 0.49, semantics per the 0.50 release notes: boolean result plus the
  * collected validation errors in the error message).
  *
  * Supported keywords: type, enum, const, properties, required,
  * additionalProperties, items, prefixItems, minItems, maxItems,
  * uniqueItems, minLength, maxLength, pattern, minimum, maximum,
  * exclusiveMinimum, exclusiveMaximum, multipleOf, anyOf, allOf, oneOf,
  * not, format, $ref into $defs/definitions (local refs only).
  *
  * Error strings follow the reference's renderer shape:
  * `<value> is not of type "integer" at /id`,
  * `"test" is a required property at /`.
  */
object JsonSchema extends Serializable {

  type JMap = java.util.Map[String, Any]
  type JList = java.util.List[Any]

  /** Validate `value` against `schema`; returns the error list (empty =
    * valid). `ignoreUnknownFormats=false` makes an unrecognized `format`
    * a validation error, matching the reference's default.
    */
  def validate(schema: Any, value: Any,
               ignoreUnknownFormats: Boolean): List[String] = {
    val errs = ArrayBuffer.empty[String]
    walk(schema, schema, value, "", ignoreUnknownFormats, errs)
    errs.toList
  }

  private def render(v: Any): String = v match {
    case null => "null"
    case s: String => "\"" + s + "\""
    case b: java.lang.Boolean => b.toString
    case n: java.lang.Long => n.toString
    case d: java.lang.Double =>
      if (d == Math.floor(d) && !d.isInfinite) d.toLong.toString else d.toString
    case m: JMap @unchecked => JsonLite.render(m)
    case l: JList @unchecked => JsonLite.render(l)
    case other => other.toString
  }

  private def typeName(v: Any): String = v match {
    case null => "null"
    case _: String => "string"
    case _: java.lang.Boolean => "boolean"
    case _: java.lang.Long | _: java.lang.Integer => "integer"
    case _: java.lang.Double | _: java.lang.Float => "number"
    case _: JList @unchecked => "array"
    case _: JMap @unchecked => "object"
    case _ => "unknown"
  }

  private def typeMatches(want: String, v: Any): Boolean = want match {
    case "integer" => typeName(v) == "integer" ||
      (v.isInstanceOf[java.lang.Double] &&
        { val d = v.asInstanceOf[java.lang.Double].doubleValue()
          d == Math.floor(d) && !d.isInfinite })
    case "number" => typeName(v) == "integer" || typeName(v) == "number"
    case other => typeName(v) == other
  }

  private def numOf(v: Any): Option[Double] = v match {
    case n: java.lang.Long => Some(n.doubleValue())
    case n: java.lang.Integer => Some(n.doubleValue())
    case d: java.lang.Double => Some(d.doubleValue())
    case f: java.lang.Float => Some(f.doubleValue())
    case _ => None
  }

  private def deepEq(a: Any, b: Any): Boolean = (a, b) match {
    case (null, null) => true
    case (x: JMap @unchecked, y: JMap @unchecked) =>
      x.size == y.size && x.asScala.forall { case (k, v) =>
        y.containsKey(k) && deepEq(v, y.get(k)) }
    case (x: JList @unchecked, y: JList @unchecked) =>
      x.size == y.size &&
        x.asScala.zip(y.asScala).forall { case (p, q) => deepEq(p, q) }
    case (x, y) => (numOf(x), numOf(y)) match {
      case (Some(p), Some(q)) => p == q
      case _ => x == y
    }
  }

  // format validators for the common published formats; everything else
  // is "unknown" and gated on ignoreUnknownFormats
  private def checkFormat(fmt: String, s: String): Option[Boolean] = fmt match {
    case "date-time" =>
      Some(try { java.time.OffsetDateTime.parse(s); true }
           catch { case _: Exception => false })
    case "date" =>
      Some(try { java.time.LocalDate.parse(s); true }
           catch { case _: Exception => false })
    case "time" =>
      Some(try { java.time.OffsetTime.parse(s); true }
           catch { case _: Exception => false })
    case "email" =>
      Some(s.matches("[^@\\s]+@[^@\\s]+\\.[^@\\s]+"))
    case "hostname" =>
      Some(s.matches("[A-Za-z0-9]([A-Za-z0-9-]{0,61}[A-Za-z0-9])?(\\.[A-Za-z0-9]([A-Za-z0-9-]{0,61}[A-Za-z0-9])?)*"))
    case "ipv4" =>
      Some(s.matches("((25[0-5]|2[0-4]\\d|1\\d\\d|[1-9]?\\d)\\.){3}(25[0-5]|2[0-4]\\d|1\\d\\d|[1-9]?\\d)"))
    case "ipv6" =>
      Some(try { java.net.InetAddress.getByName(s)
                   .isInstanceOf[java.net.Inet6Address] && s.contains(":") }
           catch { case _: Exception => false })
    case "uri" =>
      Some(try { new java.net.URI(s).isAbsolute }
           catch { case _: Exception => false })
    case "uuid" =>
      Some(s.matches("[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}"))
    case "regex" =>
      Some(try { java.util.regex.Pattern.compile(s); true }
           catch { case _: Exception => false })
    case _ => None
  }

  private def resolveRef(root: Any, ref: String): Option[Any] = {
    if (!ref.startsWith("#")) return None
    val path = ref.stripPrefix("#").stripPrefix("/")
    if (path.isEmpty) return Some(root)
    path.split("/").foldLeft(Option(root)) {
      case (Some(m: JMap @unchecked), seg) =>
        val key = seg.replace("~1", "/").replace("~0", "~")
        Option(m.get(key))
      case _ => None
    }
  }

  private def walk(root: Any, schema: Any, v: Any, path: String,
                   ignoreUnknown: Boolean, errs: ArrayBuffer[String]): Unit = {
    val at = if (path.isEmpty) " at /" else s" at /$path"
    schema match {
      case b: java.lang.Boolean =>
        // boolean schemas: `true` accepts everything, `false` nothing
        if (!b) errs += s"${render(v)} is not allowed$at"
      case m: JMap @unchecked =>
        Option(m.get("$ref")).foreach { r =>
          resolveRef(root, r.toString) match {
            case Some(sub) => walk(root, sub, v, path, ignoreUnknown, errs)
            case None => errs += s"unresolvable $$ref \"$r\"$at"
          }
        }
        Option(m.get("type")).foreach {
          case one: String =>
            if (!typeMatches(one, v))
              errs += s"${render(v)} is not of type \"$one\"$at"
          case many: JList @unchecked =>
            val names = many.asScala.map(_.toString)
            if (!names.exists(typeMatches(_, v)))
              errs += s"${render(v)} is not of types ${names.map("\"" + _ + "\"").mkString(", ")}$at"
          case _ => ()
        }
        Option(m.get("enum")).foreach {
          case opts: JList @unchecked =>
            if (!opts.asScala.exists(deepEq(_, v)))
              errs += s"${render(v)} is not one of ${opts.asScala.map(render).mkString(", ")}$at"
          case _ => ()
        }
        if (m.containsKey("const") && !deepEq(m.get("const"), v))
          errs += s"${render(v)} is not const ${render(m.get("const"))}$at"

        v match {
          case s: String =>
            Option(m.get("minLength")).flatMap(numOf).foreach(n =>
              if (s.codePointCount(0, s.length) < n)
                errs += s"${render(s)} is shorter than ${n.toLong} characters$at")
            Option(m.get("maxLength")).flatMap(numOf).foreach(n =>
              if (s.codePointCount(0, s.length) > n)
                errs += s"${render(s)} is longer than ${n.toLong} characters$at")
            Option(m.get("pattern")).foreach { p =>
              if (!java.util.regex.Pattern.compile(p.toString).matcher(s).find())
                errs += s"${render(s)} does not match \"$p\"$at"
            }
            Option(m.get("format")).foreach { f =>
              checkFormat(f.toString, s) match {
                case Some(ok) =>
                  if (!ok) errs += s"${render(s)} is not a \"$f\"$at"
                case None =>
                  if (!ignoreUnknown)
                    errs += s"unknown format \"$f\"$at"
              }
            }
          case _ => ()
        }

        numOf(v).foreach { n =>
          Option(m.get("minimum")).flatMap(numOf).foreach(lo =>
            if (n < lo) errs += s"${render(v)} is less than the minimum of ${render(m.get("minimum"))}$at")
          Option(m.get("maximum")).flatMap(numOf).foreach(hi =>
            if (n > hi) errs += s"${render(v)} is greater than the maximum of ${render(m.get("maximum"))}$at")
          Option(m.get("exclusiveMinimum")).flatMap(numOf).foreach(lo =>
            if (n <= lo) errs += s"${render(v)} is less than or equal to the exclusive minimum of ${render(m.get("exclusiveMinimum"))}$at")
          Option(m.get("exclusiveMaximum")).flatMap(numOf).foreach(hi =>
            if (n >= hi) errs += s"${render(v)} is greater than or equal to the exclusive maximum of ${render(m.get("exclusiveMaximum"))}$at")
          Option(m.get("multipleOf")).flatMap(numOf).foreach(k =>
            if (k != 0 && Math.abs(n / k - Math.rint(n / k)) > 1e-9)
              errs += s"${render(v)} is not a multiple of ${render(m.get("multipleOf"))}$at")
        }

        v match {
          case arr: JList @unchecked =>
            Option(m.get("minItems")).flatMap(numOf).foreach(n =>
              if (arr.size < n) errs += s"${render(v)} has less than ${n.toLong} items$at")
            Option(m.get("maxItems")).flatMap(numOf).foreach(n =>
              if (arr.size > n) errs += s"${render(v)} has more than ${n.toLong} items$at")
            if (m.get("uniqueItems") == java.lang.Boolean.TRUE) {
              val items = arr.asScala.toList
              val dup = items.combinations(2).exists(p => deepEq(p.head, p(1)))
              if (dup) errs += s"${render(v)} has non-unique elements$at"
            }
            val prefix = Option(m.get("prefixItems")).collect {
              case l: JList @unchecked => l.asScala.toList }.getOrElse(Nil)
            arr.asScala.zipWithIndex.foreach { case (e, i) =>
              val sub = if (i < prefix.length) Some(prefix(i))
                        else Option(m.get("items"))
              sub.foreach(s =>
                walk(root, s, e, s"$path/$i".stripPrefix("/"), ignoreUnknown, errs))
            }
          case _ => ()
        }

        v match {
          case obj: JMap @unchecked =>
            Option(m.get("required")).foreach {
              case req: JList @unchecked => req.asScala.foreach { k =>
                if (!obj.containsKey(k.toString))
                  errs += s"\"$k\" is a required property$at"
              }
              case _ => ()
            }
            val props = Option(m.get("properties")).collect {
              case p: JMap @unchecked => p }
            props.foreach(_.asScala.foreach { case (k, sub) =>
              if (obj.containsKey(k))
                walk(root, sub, obj.get(k), s"$path/$k".stripPrefix("/"),
                  ignoreUnknown, errs)
            })
            Option(m.get("additionalProperties")).foreach { ap =>
              val known = props.map(_.keySet().asScala.toSet).getOrElse(Set.empty)
              val extra = obj.keySet().asScala.filterNot(known)
              ap match {
                case b: java.lang.Boolean =>
                  if (!b) extra.foreach(k =>
                    errs += s"Additional properties are not allowed ('$k' was unexpected)$at")
                case sub => extra.foreach(k =>
                  walk(root, sub, obj.get(k), s"$path/$k".stripPrefix("/"),
                    ignoreUnknown, errs))
              }
            }
            Option(m.get("minProperties")).flatMap(numOf).foreach(n =>
              if (obj.size < n) errs += s"${render(v)} does not have enough properties$at")
            Option(m.get("maxProperties")).flatMap(numOf).foreach(n =>
              if (obj.size > n) errs += s"${render(v)} has too many properties$at")
          case _ => ()
        }

        def sub(key: String): List[Any] = Option(m.get(key)).collect {
          case l: JList @unchecked => l.asScala.toList }.getOrElse(Nil)
        val anyOf = sub("anyOf")
        if (anyOf.nonEmpty &&
            !anyOf.exists(s => validateSub(root, s, v, ignoreUnknown)))
          errs += s"${render(v)} is not valid under any of the schemas listed in the 'anyOf' keyword$at"
        sub("allOf").foreach(s => walk(root, s, v, path, ignoreUnknown, errs))
        val oneOf = sub("oneOf")
        if (oneOf.nonEmpty) {
          val n = oneOf.count(s => validateSub(root, s, v, ignoreUnknown))
          if (n != 1)
            errs += s"${render(v)} is valid under $n of the schemas listed in the 'oneOf' keyword$at"
        }
        Option(m.get("not")).foreach { s =>
          if (validateSub(root, s, v, ignoreUnknown))
            errs += s"${render(v)} should not be valid under the schema listed in the 'not' keyword$at"
        }
      case _ => () // non-map non-bool schema nodes validate nothing
    }
  }

  private def validateSub(root: Any, schema: Any, v: Any,
                          ignoreUnknown: Boolean): Boolean = {
    val errs = ArrayBuffer.empty[String]
    walk(root, schema, v, "", ignoreUnknown, errs)
    errs.isEmpty
  }
}
