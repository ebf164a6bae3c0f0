package graft.codecs

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.JsonLite

/** Fixed-seed property roundtrips for the session's codec surfaces:
  * the native event codec over arbitrary JSON value trees, and the BPE
  * tokenizer over arbitrary unicode text — the invariants (byte/value
  * fidelity) these formats rest on, explored across the value space
  * rather than hand-picked examples. Deterministic seeds, no flake
  * surface.
  */
class RoundtripPropertySpec extends org.scalatest.funsuite.AnyFunSuite {

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i =>
      g.apply(Gen.Parameters.default, Seed(1234L + i)))

  // JSON value trees: scalars at the leaves, maps/arrays above,
  // depth-bounded
  private val scalarGen: Gen[Any] = Gen.oneOf(
    Gen.alphaNumStr.map(identity[Any]),
    Gen.choose(Long.MinValue / 2, Long.MaxValue / 2).map(l =>
      java.lang.Long.valueOf(l): Any),
    Gen.choose(-1e6, 1e6).map(d =>
      java.lang.Double.valueOf(math.rint(d * 100) / 100): Any),
    Gen.oneOf(java.lang.Boolean.TRUE: Any, java.lang.Boolean.FALSE: Any),
    Gen.const(null: Any))

  private def valueGen(depth: Int): Gen[Any] =
    if (depth <= 0) scalarGen
    else Gen.frequency(
      (5, scalarGen),
      (2, Gen.mapOf(Gen.zip(
          Gen.identifier.suchThat(_.nonEmpty), valueGen(depth - 1)))
        .map { m =>
          val out = new java.util.LinkedHashMap[String, Any]()
          m.foreach { case (k, v) => out.put(k, v) }
          out: Any
        }),
      (2, Gen.listOf(valueGen(depth - 1)).map { l =>
        val out = new java.util.ArrayList[Any]()
        l.foreach(out.add)
        out: Any
      }))

  private val eventGen: Gen[java.util.LinkedHashMap[String, Any]] =
    Gen.mapOf(Gen.zip(Gen.identifier.suchThat(_.nonEmpty), valueGen(2)))
      .map { m =>
        val out = new java.util.LinkedHashMap[String, Any]()
        m.foreach { case (k, v) => out.put(k, v) }
        out
      }

  test("native codec: arbitrary event trees survive encode→decode") {
    samples(eventGen, 200).foreach { ev =>
      val json = JsonLite.render(ev)
      val bytes = NativeCodec.encodeWrapper(json)
      val decoded = NativeCodec.decodeWrapper(bytes)
      assert(decoded != null, s"undecodable: $json")
      val back = JsonLite.parse(decoded._2)
      assert(back == JsonLite.parse(json),
        s"mismatch:\n in: $json\nout: ${decoded._2}")
    }
  }

  test("bpe: arbitrary unicode text survives encode→decode byte-exact") {
    val emoji = new String(Character.toChars(0x1F642)) // surrogate pair
    val textGen: Gen[String] = Gen.listOf(Gen.frequency(
      (6, Gen.alphaNumChar.map(_.toString)),
      (2, Gen.oneOf(" ", "\n", "\t", ".", ",", "!", "'")),
      (1, Gen.oneOf("é", "ü", "世", "界", emoji, "Ω")))).map(_.mkString)
    val corpus = samples(textGen, 50).filter(_.nonEmpty)
    // train on half the samples, roundtrip ALL (unseen text included)
    val spark = graft.Graft.session(4)
    import spark.implicits._
    val model = graft.datapipe.Bpe.train(
      corpus.take(25).toDF("text"), org.apache.spark.sql.functions.col("text"),
      numMerges = 60)
    samples(textGen, 300).foreach { s =>
      assert(model.decode(model.encode(s)) == s, s"roundtrip of: [$s]")
    }
  }
}
