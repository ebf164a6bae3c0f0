package graft.functions

import graft.SparkSpec

/** VRL `validate_json_schema` (vector 0.49; 0.50 release-notes
  * semantics: boolean result, validation errors on the error channel)
  * and the [[JsonSchema]] validator behind it.
  */
class JsonSchemaSpec extends SparkSpec {
  import spark.implicits._

  private def parse(s: String): Any = JsonLite.parse(s)

  private val releaseNotesSchema =
    """{
      |  "$schema": "https://json-schema.org/draft/2020-12/schema",
      |  "type": "object",
      |  "properties": {
      |    "test": { "type": "boolean" },
      |    "id": { "type": "integer" }
      |  },
      |  "required": ["test"],
      |  "additionalProperties": false
      |}""".stripMargin

  test("validator reproduces the 0.50 release-notes example errors") {
    val schema = parse(releaseNotesSchema)
    val errs = JsonSchema.validate(schema, parse("""{"id":"123"}"""), false)
    assert(errs.contains("\"123\" is not of type \"integer\" at /id"))
    assert(errs.contains("\"test\" is a required property at /"))
    assert(JsonSchema.validate(schema,
      parse("""{"test":true,"id":7}"""), false).isEmpty)
    // additionalProperties: false rejects unknown keys
    assert(JsonSchema.validate(schema,
      parse("""{"test":true,"zz":1}"""), false)
      .exists(_.contains("'zz' was unexpected")))
  }

  test("numeric, string, array and combinator keywords") {
    val s = parse(
      """{"type":"object","properties":{
        |  "n": {"type":"number","minimum":0,"exclusiveMaximum":10,"multipleOf":0.5},
        |  "s": {"type":"string","minLength":2,"maxLength":4,"pattern":"^a"},
        |  "a": {"type":"array","items":{"type":"integer"},"minItems":1,"uniqueItems":true},
        |  "e": {"enum":["x","y",3]},
        |  "u": {"anyOf":[{"type":"string"},{"type":"integer"}]}
        |}}""".stripMargin)
    def errsOf(j: String) = JsonSchema.validate(s, parse(j), false)
    assert(errsOf("""{"n":2.5,"s":"abc","a":[1,2],"e":"y","u":5}""").isEmpty)
    assert(errsOf("""{"n":-1}""").exists(_.contains("less than the minimum")))
    assert(errsOf("""{"n":10}""").exists(_.contains("exclusive maximum")))
    assert(errsOf("""{"n":0.3}""").exists(_.contains("not a multiple of")))
    assert(errsOf("""{"s":"a"}""").exists(_.contains("shorter than 2")))
    assert(errsOf("""{"s":"bcd"}""").exists(_.contains("does not match")))
    assert(errsOf("""{"a":[]}""").exists(_.contains("less than 1 items")))
    assert(errsOf("""{"a":[1,1]}""").exists(_.contains("non-unique")))
    assert(errsOf("""{"a":[1,"x"]}""")
      .exists(_ == "\"x\" is not of type \"integer\" at /a/1"))
    assert(errsOf("""{"e":"z"}""").exists(_.contains("not one of")))
    assert(errsOf("""{"u":true}""").exists(_.contains("anyOf")))
  }

  test("$ref into $defs and format handling with ignore_unknown_formats") {
    val s = parse(
      """{"$defs":{"port":{"type":"integer","minimum":1,"maximum":65535}},
        |"type":"object",
        |"properties":{
        |  "p": {"$ref":"#/$defs/port"},
        |  "ip": {"type":"string","format":"ipv4"},
        |  "odd": {"type":"string","format":"no-such-format"}
        |}}""".stripMargin)
    assert(JsonSchema.validate(s, parse("""{"p":80,"ip":"10.0.0.1"}"""), false).isEmpty)
    assert(JsonSchema.validate(s, parse("""{"p":0}"""), false)
      .exists(_.contains("minimum")))
    assert(JsonSchema.validate(s, parse("""{"ip":"999.0.0.1"}"""), false)
      .exists(_.contains("is not a \"ipv4\"")))
    // unknown format: error by default, ignored when asked (docs wording)
    assert(JsonSchema.validate(s, parse("""{"odd":"x"}"""), false)
      .exists(_.contains("unknown format")))
    assert(JsonSchema.validate(s, parse("""{"odd":"x"}"""), true).isEmpty)
  }

  test("VRL validate_json_schema: boolean result + error-channel detail") {
    val schemaFile = java.nio.file.Files.createTempFile("vjs", ".json")
    java.nio.file.Files.write(schemaFile, releaseNotesSchema.getBytes("UTF-8"))
    val df = Seq(
      (1L, """{"test":true,"id":7}"""),
      (2L, """{"id":"123"}"""),
      (3L, "not json at all")).toDF("id", "s")
    val out = VrlCompiler.run(df,
      s""".valid, .err = validate_json_schema(.s, "$schemaFile")""")
      .primary.orderBy("id")
      .select("valid", "err").collect()
    assert(out(0).getBoolean(0) && out(0).isNullAt(1))
    // failed validation: false + the collected errors on the channel
    assert(!out(1).getBoolean(0))
    val msg = out(1).getString(1)
    assert(msg.contains("function call error for \"validate_json_schema\""))
    assert(msg.contains("JSON schema validation failed"))
    assert(msg.contains("\"123\" is not of type \"integer\" at /id"))
    assert(msg.contains("\"test\" is a required property at /"))
    assert(!out(2).getBoolean(0) && !out(2).isNullAt(1)) // unparseable input errors too
    java.nio.file.Files.delete(schemaFile)
  }

  test("VRL validate_json_schema: ?? fallback and missing file at compile") {
    val schemaFile = java.nio.file.Files.createTempFile("vjs2", ".json")
    java.nio.file.Files.write(schemaFile,
      """{"type":"object","required":["a"]}""".getBytes("UTF-8"))
    val df = Seq((1L, """{"b":1}""")).toDF("id", "s")
    val r = VrlCompiler.run(df,
      s""".ok = validate_json_schema(.s, "$schemaFile",
         |  ignore_unknown_formats: true) ?? false""".stripMargin)
      .primary.head()
    assert(!r.getAs[Boolean]("ok"))
    val e = intercept[VrlCompiler.VrlCompileException] {
      VrlCompiler.run(df,
        """.ok = validate_json_schema(.s, "/no/such/schema.json")""")
    }
    assert(e.msg.contains("cannot read schema file"))
    java.nio.file.Files.delete(schemaFile)
  }
}
