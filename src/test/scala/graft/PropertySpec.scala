package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import org.scalacheck.Test.Parameters
import graft.ops.{Dedup, TextStats}

/** Property-based invariants (SURVEY.md §5.3). Case counts are kept
  * small — each evaluation runs Spark jobs.
  */
object PropertySpec extends Properties("graft") {

  override def overrideParameters(p: Parameters): Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark = GraftSession.local(4)
  import spark.implicits._

  private val vocab = Vector("the", "quick", "brown", "fox", "jumps", "over",
    "lazy", "dog", "data", "spark", "stream", "batch", "merge", "sort")

  private val genDoc: Gen[String] =
    Gen.chooseNum(4, 40).flatMap(n => Gen.listOfN(n, Gen.oneOf(vocab)))
      .map(_.mkString(" "))

  private val genDocs: Gen[List[String]] =
    Gen.chooseNum(2, 12).flatMap(n => Gen.listOfN(n, genDoc))

  property("exact dedup is idempotent") = forAll(genDocs) { texts =>
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val once = Dedup.exact(df, Seq("text"))
    Dedup.exact(once, Seq("text")).count() == once.count()
  }

  property("dedup count = distinct key count") = forAll(genDocs) { texts =>
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    Dedup.exact(df, Seq("text")).count() == texts.distinct.size
  }

  property("token stats invariants") = forAll(genDoc) { text =>
    val r = TextStats.tokenStats(Seq((1L, text)).toDF("doc_id", "text")).head()
    val nTok = r.getAs[Long]("n_tokens")
    val nDist = r.getAs[Long]("n_distinct")
    val tokChars = r.getAs[Long]("token_chars")
    val lenChars = r.getAs[Long]("len_chars")
    nDist <= nTok && nDist >= 1 &&
      tokChars + (nTok - 1) == lenChars // single-space separated corpus
  }

  property("identical docs always minhash-collide; signature deterministic") =
    forAll(genDoc) { text =>
      val df = Seq((0L, text), (1L, text)).toDF("doc_id", "text")
      val sigs = Dedup.minhashSignatures(df).collect()
        .map(r => r.getAs[Long]("doc_id") -> r.getSeq[Long](1)).toMap
      sigs(0L) == sigs(1L)
    }

  property("simhash of identical docs is equal; hamming(a,a)=0") =
    forAll(genDoc) { text =>
      val sig = Dedup.simhash(Seq((0L, text), (1L, text)).toDF("doc_id", "text"))
        .collect().map(_.getAs[Long]("simhash"))
      sig(0) == sig(1)
    }

  property("fingerprint is stable and in [0, 1e9+7)") = forAll(genDoc) { text =>
    val fp = Seq((1L, text)).toDF("doc_id", "text")
      .select(TextStats.fingerprint(org.apache.spark.sql.functions.col("text")))
      .head().getLong(0)
    fp >= 0 && fp < 1000000007L
  }

  property("TopK aggregator equals window row_number top-k on random data") =
    forAll(Gen.chooseNum(5, 60).flatMap(n =>
      Gen.listOfN(n, Gen.zip(Gen.oneOf("a", "b", "c"), Gen.chooseNum(0, 9)))
    )) { rows =>
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.functions._
      // duplicate values across groups + few distinct values force the
      // tiebreak path; 8 partitions force non-trivial partial merges
      val df = rows.zipWithIndex
        .map { case ((g, v), i) => (g, v.toDouble, i.toLong) }
        .toDF("g", "v", "id").repartition(8)
      val got = graft.ops.TopK.topKPerGroup(df, "g", "v", "id", k = 3)
        .select("g", "rnk", "v", "id").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
      val want = df.withColumn("rnk", row_number().over(
          Window.partitionBy(col("g")).orderBy(col("v").desc, col("id"))).cast("long"))
        .filter(col("rnk") <= 3).select("g", "rnk", "v", "id").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
      got == want
    }

  property("TopK large-k: lazy buffer growth + partial-merge serde match the window form") =
    forAll(Gen.chooseNum(150, 400)) { n =>
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.functions._
      // k=100 > the 16-slot initial buffer forces geometric growth,
      // and 8 partitions force serialize/deserialize of PARTIALLY
      // GROWN buffers (the eager-allocation bug class: deserialize
      // writing past a lazily-sized array)
      val rnd = new scala.util.Random(n)
      val df = (0 until n).map(i => (i % 2, rnd.nextInt(50).toDouble, i.toLong))
        .toDF("g", "v", "id").repartition(8)
      val got = graft.ops.TopK.topKPerGroup(df, "g", "v", "id", k = 100)
        .select("g", "rnk", "v", "id").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
      val want = df.withColumn("rnk", row_number().over(
          Window.partitionBy(col("g")).orderBy(col("v").desc, col("id"))).cast("long"))
        .filter(col("rnk") <= 100)
        .select(col("g").cast("string"), col("rnk"), col("v"), col("id")).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
      got == want
    }

  property("misra-gries: never overcounts, undercounts within n/k, heavy hitters survive") =
    forAll(Gen.chooseNum(2, 6), Gen.chooseNum(1, 8)) { (k, nPart) =>
      // a skewed stream: token i appears ~2^(vocab.size - i) times
      val stream = vocab.zipWithIndex.flatMap { case (t, i) =>
        List.fill(1 << math.max(0, 8 - i))(t)
      }
      val n = stream.size.toLong
      val exact = stream.groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
      val sketch = spark.createDataset(stream).repartition(nPart)
        .select(new graft.ops.HeavyHitters.MisraGriesAgg(k).toColumn.name("m"))
        .head()
      sketch.size <= k - 1 &&
        sketch.forall { case (t, est) => est >= 1 && est <= exact(t) } &&
        exact.forall { case (t, c) =>
          val est = sketch.getOrElse(t, 0L)
          c - est <= n / k && (c * k <= n || est > 0)
        }
    }

  property("token-count rewrite is value-identical to size(split) on arbitrary strings") =
    forAll(Gen.listOf(Gen.oneOf(Gen.alphaNumStr, Gen.const(" "), Gen.const("  "),
      Gen.const(""), Gen.const("\t")))) { parts =>
      import org.apache.spark.sql.functions._
      val s = parts.mkString
      val df = Seq(Tuple1(s)).toDF("text")
      // optimized path (rule rewrites) vs literal spaces+1 definition
      val got = df.select(size(split(col("text"), " "))).head().getInt(0)
      got == s.count(_ == ' ') + 1
    }
}
