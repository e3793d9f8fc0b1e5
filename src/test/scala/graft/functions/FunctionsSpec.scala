package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.functions._

import graft.SparkSpec

class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("shingles: windows of 3, singles when short, empty when too short") {
    val df = Seq("a b c d e", "a b c", "a b").toDF("text")
    val got = df.select(TextOps.shingles(TextOps.tokens(col("text")), 3).as("sh"))
      .as[Seq[String]].collect().toSeq
    assert(got(0) === Seq("a b c", "b c d", "c d e"))
    assert(got(1) === Seq("a b c"))
    assert(got(2) === Seq.empty)
  }

  test("hash56 equals the first 56 bits of md5") {
    def ref(s: String): Long = {
      val hex = MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 14)
      java.lang.Long.parseLong(hex, 16)
    }
    val inputs = Seq("hello", "", "0:the quick fox", "ünïcode")
    val got = inputs.toDF("s").select(TextOps.hash56(col("s"))).as[Long].collect().toSeq
    assert(got === inputs.map(ref))
  }

  test("native Hash56 expression equals the composed conv(substring(md5)) form in bulk") {
    val toks = graft.Tables.documents(spark, sf0001)
      .select(explode(TextOps.shingles(TextOps.tokens(col("text")), 3)).as("sh"))
    val diffs = toks
      .select(TextOps.hash56(col("sh")).as("a"), TextOps.hash56Composed(col("sh")).as("b"))
      .filter(col("a") =!= col("b"))
      .count()
    assert(diffs === 0L, "digest-byte path must reproduce the hex-string path exactly")
  }

  test("native PositionalShingleHash equals the composed transform/concat_ws/md5 form in bulk") {
    val diffs = graft.Tables.documents(spark, sf0001)
      .select(TextOps.tokens(col("text")).as("tk"))
      .select(TextOps.positionalHashedShingles(col("tk"), 3).as("a"),
        TextOps.positionalHashedShinglesComposed(col("tk"), 3).as("b"))
      .filter(not(col("a") <=> col("b")))
      .count()
    assert(diffs === 0L, "fused md5 loop must reproduce the interpreted HOF pipeline exactly")
  }

  test("PositionalShingleHash edge cases: short, exact-width, null input -> empty/whole-doc") {
    val df = Seq(Some("a b"), Some("a b c"), None).toDF("text")
    val got = df
      .select(TextOps.positionalHashedShingles(TextOps.tokens(col("text")), 3).as("sp"))
      .as[Seq[Long]].collect().toSeq
    assert(got(0) === Seq.empty, "doc shorter than n must yield an empty array")
    def ref(s: String): Long = {
      val hex = MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 14)
      java.lang.Long.parseLong(hex, 16)
    }
    assert(got(1) === Seq(ref("a b c")), "exact-width doc is its own single shingle")
    // the composed form's when() folds a null token array to the empty
    // array (never null) — the native expression must do the same
    assert(got(2) === Seq.empty, "null input must yield an empty array like the composed when()")
  }

  test("cosine: orthogonal -> 0, identical -> 1, known angle") {
    val df = Seq(
      (Seq(1.0, 0.0), Seq(0.0, 1.0)),
      (Seq(1.0, 1.0), Seq(1.0, 1.0)),
      (Seq(1.0, 0.0), Seq(1.0, 1.0))).toDF("a", "b")
    val got = df.select(VectorOps.cosine(col("a"), col("b"))).as[Double].collect()
    assert(got(0) === 0.0)
    assert(math.abs(got(1) - 1.0) < 1e-12)
    assert(math.abs(got(2) - 1.0 / math.sqrt(2)) < 1e-12)
  }

  test("native DotProduct expression is bit-identical to the HOF fold") {
    val e = graft.Tables.embeddings(spark, sf0001)
      .select(VectorOps.toDoubleArray(col("embedding")).as("v"))
      .limit(200)
    val pairs = e.crossJoin(e.select(col("v").as("w")).limit(50))
    val diffs = pairs
      .select((VectorOps.dot(col("v"), col("w")) - VectorOps.dotHof(col("v"), col("w"))).as("d"))
      .filter(col("d") =!= 0.0)
      .count()
    assert(diffs === 0L, "codegen'd dot must reproduce the HOF fold exactly")
  }
}
