package graft.codecs

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Property-based roundtrips for the framing layer — arbitrary payloads
  * in, frame, unframe, byte-identical payloads out. These are the
  * invariants the wire protocols rest on; example-based specs cover the
  * protocol behavior, these cover the payload space (empty batches,
  * frames containing digits/spaces that could confuse the octet
  * scanner, multi-frame concatenations). Raw ScalaCheck generators with
  * FIXED seeds: deterministic across runs, no flake surface.
  */
class FramingPropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i =>
      g.apply(Gen.Parameters.default, Seed(42L + i)))

  // payloads: printable-ish plus spaces and digits (octet counting's
  // header alphabet) but no newlines, which newline framing consumes
  private val payloadGen: Gen[String] =
    Gen.listOf(Gen.frequency(
      (8, Gen.alphaNumChar),
      (2, Gen.oneOf(' ', '.', ':', '-', '#')))).map(_.mkString)
  private val payloadsGen: Gen[List[String]] =
    Gen.choose(0, 5).flatMap(n =>
      Gen.listOfN(n, payloadGen).map(_.filter(_.nonEmpty)))

  test("octet-counting framing roundtrips arbitrary payload batches") {
    samples(payloadsGen, 60).foreach { parts =>
      val chunk = parts.map(p => s"${p.length} $p").mkString
      val out = Seq(chunk).toDF("c")
        .select(Framing.octetCounting(col("c")).as("f"))
        .head().getSeq[String](0)
      assert(out.toList == parts, s"octet roundtrip broke on $parts")
    }
  }

  test("varint length framing roundtrips arbitrary payload batches") {
    samples(payloadsGen, 60).foreach { parts =>
      val packed = Seq(parts).toDF("p")
        .select(Framing.varintPack(col("p")).as("b"))
        .head().getAs[Array[Byte]](0)
      val out = Seq(packed).toDF("b")
        .select(Framing.varintLengthDelimited(col("b")).as("f"))
        .head().getSeq[Array[Byte]](0)
      assert(out.map(new String(_, "UTF-8")).toList == parts,
        s"varint roundtrip broke on $parts")
    }
  }

  test("gelf chunking reassembles arbitrary payloads at any chunk count") {
    val cases = for {
      payload <- payloadGen.suchThat(_.nonEmpty)
      n <- Gen.choose(1, 8)
      msgId <- Gen.choose(Long.MinValue, Long.MaxValue)
    } yield (payload, n, msgId)
    samples(cases, 40).foreach { case (payload, n, msgId) =>
      val chunks = Seq((msgId, payload, n)).toDF("id", "p", "n")
        .select(explode(Framing.gelfChunksOf(col("id"), col("p"),
          col("n"))).as("c"))
      val out = Framing.chunkedGelf(chunks, col("c"))
        .select("message").head().getString(0)
      assert(out == payload,
        s"gelf reassembly broke on ($payload, $n chunks)")
    }
  }

  test("length-delimited framing roundtrips byte payloads") {
    samples(payloadsGen, 60).foreach { parts =>
      val bb = new java.io.ByteArrayOutputStream()
      val dd = new java.io.DataOutputStream(bb)
      parts.foreach { p =>
        val b = p.getBytes("UTF-8")
        dd.writeInt(b.length); dd.write(b)
      }
      val out = Seq(bb.toByteArray).toDF("b")
        .select(Framing.lengthDelimited(col("b")).as("f"))
        .head().getSeq[Array[Byte]](0)
      assert(out.map(new String(_, "UTF-8")).toList == parts,
        s"length-delimited roundtrip broke on $parts")
    }
  }
}
