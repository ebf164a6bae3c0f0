package graft.functions

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

/** Minimal JSON <-> plain-Java-values bridge for the byte-level codecs
  * (CBOR, proto) that need a dynamic tree rather than a Spark schema.
  * Jackson is already on the Spark runtime classpath.
  *
  * Values: null | java.lang.Boolean | java.lang.Long | java.lang.Double |
  * String | java.util.ArrayList | java.util.LinkedHashMap (field order
  * preserved — deterministic roundtrips).
  */
object JsonLite {
  private val mapper = new ObjectMapper()

  def parse(json: String): Any = fromNode(mapper.readTree(json))

  private def fromNode(n: JsonNode): Any = {
    if (n == null || n.isNull) null
    else if (n.isBoolean) java.lang.Boolean.valueOf(n.asBoolean())
    else if (n.isIntegralNumber) java.lang.Long.valueOf(n.asLong())
    else if (n.isNumber) java.lang.Double.valueOf(n.asDouble())
    else if (n.isTextual) n.asText()
    else if (n.isArray) {
      val out = new java.util.ArrayList[Any](n.size())
      n.forEach(e => out.add(fromNode(e)))
      out
    } else if (n.isObject) {
      val out = new java.util.LinkedHashMap[String, Any]()
      n.properties().forEach(e => out.put(e.getKey, fromNode(e.getValue)))
      out
    } else n.asText()
  }

  def render(v: Any): String = mapper.writeValueAsString(v)
}
