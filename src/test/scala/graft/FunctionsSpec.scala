package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.CosineSimilarity
import graft.pipeline.Similarity

class FunctionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  def vecs = Seq(
    (1L, Array(1.0f, 0.0f, 2.0f), Array(0.5f, 0.5f, 1.0f)),
    (2L, Array(0.0f, 1.0f, 0.0f), Array(1.0f, 0.0f, 0.0f)),
    (3L, Array(0.3f, -0.7f, 0.1f), Array(-0.3f, 0.7f, -0.1f))
  ).toDF("id", "a", "b")

  test("native expression matches the HOF formulation bit-for-bit") {
    val both = vecs.select(
      Similarity.cosine($"a", $"b").as("native"),
      Similarity.cosineHof($"a", $"b").as("hof")).collect()
    both.foreach(r => assert(r.getDouble(0) === r.getDouble(1)))
  }

  test("expression works on double arrays too") {
    val d = Seq((Array(1.0, 0.0), Array(1.0, 0.0))).toDF("a", "b")
    assert(d.select(Similarity.cosine($"a", $"b")).head().getDouble(0) === 1.0)
  }

  test("type check rejects mismatched inputs") {
    val bad = Seq((Array(1.0f), "x")).toDF("a", "b")
    intercept[Exception](bad.select(Similarity.cosine($"a", $"b")).collect())
  }

  test("SQL registration exposes cosine_similarity()") {
    CosineSimilarity.register(spark)
    vecs.createOrReplaceTempView("vecs_t")
    val r = spark.sql(
      "SELECT id, cosine_similarity(a, b) AS s FROM vecs_t WHERE id = 2").head()
    assert(math.abs(r.getDouble(1)) < 1e-12)
  }

  test("registerAll exposes the whole custom-function surface to SQL") {
    graft.functions.GraftFunctions.registerAll(spark)
    vecs.createOrReplaceTempView("vecs_t")
    val b = spark.sql(
      "SELECT lsh_buckets(a, 4, 2) AS bk FROM vecs_t WHERE id = 1").head()
      .getSeq[Long](0)
    assert(b.length === 2 && b(0) < 16 && b(1) >= 16 && b(1) < 32)
    val sh = spark.sql(
      "SELECT ngram_shingles(split('a b c d', ' '), 3) AS sh").head()
      .getSeq[String](0)
    assert(sh === Seq("a b c", "b c d"))
    // plan-time params must be literals
    intercept[Exception] {
      spark.sql("SELECT ngram_shingles(split('a b', ' '), id) FROM vecs_t")
        .collect()
    }
  }

  test("ngram_hashes matches the md5-HOF formulation bit-for-bit") {
    val docs = Seq(
      "the quick brown fox jumps over the lazy dog",
      "héllo wörld ünïcode tökens ärë bytes",      // multi-byte UTF-8
      "a b c d e",                                  // exactly k tokens (k=5)
      "one two three four",                         // shorter than k → filtered
      "x x x x x x x x x x"                         // repeated token
    ).zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val k = 5
    val hof = s"""transform(sequence(1, size(toks) - $k + 1),
        p -> cast(conv(substring(md5(concat_ws(' ', slice(toks, p, $k))),
                       1, 15), 16, 10) as bigint))"""
    val both = docs
      .select($"id", split($"text", " ").as("toks"))
      .where(size($"toks") >= k)
      .select($"id", expr(hof).as("want"),
        graft.functions.NGramHashes.ngram_hashes($"toks", k).as("got"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      assert(r.getSeq[Long](1) === r.getSeq[Long](2), s"doc ${r.getLong(0)}")
    }
  }

  test("ngram_hashes: short input empty, SQL-registered, literal-only n") {
    graft.functions.GraftFunctions.registerAll(spark)
    val e = spark.sql("SELECT ngram_hashes(split('a b', ' '), 5) AS h").head()
    assert(e.getSeq[Long](0).isEmpty)
    val one = spark.sql("SELECT ngram_hashes(split('a b c', ' '), 3) AS h").head()
      .getSeq[Long](0)
    val mirror = spark.sql(
      "SELECT cast(conv(substring(md5('a b c'), 1, 15), 16, 10) as bigint) AS h")
      .head().getLong(0)
    assert(one === Seq(mirror))
    intercept[Exception] {
      spark.sql("SELECT ngram_hashes(split('a b', ' '), cast(rand()*3 as int))")
        .collect()
    }
  }

  test("malformed input yields null, not a plausible number") {
    // length mismatch
    val mis = Seq((Array(1.0f, 2.0f), Array(1.0f))).toDF("a", "b")
    assert(mis.select(Similarity.cosine($"a", $"b")).head().isNullAt(0))
    // null element
    val ne = Seq((Array[java.lang.Float](1.0f, null), Array[java.lang.Float](1.0f, 2.0f)))
      .toDF("a", "b")
    assert(ne.select(Similarity.cosine($"a", $"b")).head().isNullAt(0))
    // zero-norm vector (would be NaN)
    val z = Seq((Array(0.0f, 0.0f), Array(1.0f, 2.0f))).toDF("a", "b")
    assert(z.select(Similarity.cosine($"a", $"b")).head().isNullAt(0))
    // same cases through a parquet-backed scan exercise the codegen path
    val emb = core.Tables.embeddings(spark, "/root/testdata/sf0.001").limit(1)
    val viaScan = emb.select(
      Similarity.cosine($"embedding", slice($"embedding", 1, 3)).as("mis"),
      Similarity.cosine(
        expr("transform(embedding, x -> cast(0.0 as float))"), $"embedding").as("zero"))
      .head()
    assert(viaScan.isNullAt(0) && viaScan.isNullAt(1))
  }

  test("nearest_centroids matches the crossJoin+window argmax") {
    val emb = core.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val cents = graft.pipeline.Similarity.centroids(emb, 8)
    // reference formulation: score every (vec, centroid), rank, keep 1
    val centsDf = cents.map { case (id, v) => (id, v.map(_.toFloat)) }
      .toDF("cent_id", "cent")
    val expect = emb.crossJoin(broadcast(centsDf))
      .withColumn("csim", Similarity.cosine($"embedding", $"cent"))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy($"vec_id")
          .orderBy($"csim".desc, $"cent_id".asc)))
      .where($"rk" === 1)
      .select($"vec_id", $"cent_id".as("cell"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = graft.pipeline.Similarity.ivfAssign(emb, cents)
      .collect().map(r => r.getAs[Long]("nid") -> r.getAs[Long]("cell")).toMap
    assert(got === expect)
  }

  test("lsh_buckets: interpreted eval equals codegen; band encoding disjoint") {
    val emb = core.Tables.embeddings(spark, "/root/testdata/sf0.001").limit(50)
    val bCol = graft.functions.LshBuckets.lsh_buckets($"embedding", 5, 3)
    val viaScan = emb.select($"vec_id", bCol).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    // interpreted path: evaluate on locally collected rows
    val rows = emb.select($"vec_id", $"embedding").collect()
    rows.foreach { r =>
      val arr = new org.apache.spark.sql.catalyst.util.GenericArrayData(
        r.getSeq[Float](1).toArray)
      val got = graft.functions.LshBuckets(
          org.apache.spark.sql.catalyst.expressions.Literal(arr,
            org.apache.spark.sql.types.ArrayType(
              org.apache.spark.sql.types.FloatType)), 5, 3)
        .buckets(arr).toLongArray.toSeq
      assert(got === viaScan(r.getLong(0)))
      // band b's bucket lives in [b*2^planes, (b+1)*2^planes)
      got.zipWithIndex.foreach { case (bk, b) =>
        assert(bk >= b.toLong * 32 && bk < (b + 1).toLong * 32)
      }
    }
  }

  test("expression stays inside whole-stage codegen") {
    // a local relation folds the projection; use a real scan
    val emb = core.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val plan = emb.select(Similarity.cosine($"embedding", $"embedding"))
      .queryExecution.executedPlan.toString
    // the "*(n)" stage prefix marks WholeStageCodegen in plan toString
    assert(plan.startsWith("*(1) Project [cosinesimilarity"))
  }

  test("misra-gries: exact when k ≥ cardinality, bounded undercount below") {
    import graft.functions.MisraGries.misra_gries
    val items = (Seq.fill(50)("a") ++ Seq.fill(6)("b") ++
      Seq.fill(3)("c") ++ Seq("d")).zipWithIndex
    val df = items.map { case (s, i) => (i.toLong, s) }.toDF("i", "tok")
    // k ≥ distinct count → no decrement ever fires, counts are EXACT
    val exact = df.agg(misra_gries($"tok", 10).as("sk"))
      .selectExpr("explode(sk) AS e").selectExpr("e.item", "e.cnt")
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(exact === Map("a" -> 50L, "b" -> 6L, "c" -> 3L, "d" -> 1L))
    // k = 2, N = 60: anything with c·3 > 60 (i.e. c > 20) must appear,
    // and every estimate is an undercount by at most N/(k+1) = 20
    val small = df.repartition(4).agg(misra_gries($"tok", 2).as("sk"))
      .selectExpr("explode(sk) AS e").selectExpr("e.item", "e.cnt")
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(small.contains("a"))
    assert(small("a") <= 50L && small("a") >= 30L)
    assert(small.size <= 2)
    small.foreach { case (item, est) =>
      val c = Map("a" -> 50L, "b" -> 6L, "c" -> 3L, "d" -> 1L)(item)
      assert(est <= c && c - est <= 20L)
    }
  }

  test("hashed_embedding ≡ the composable HOF formulation, bit-exact") {
    val docs = core.Tables.documents(spark, "/root/testdata/sf0.001")
    val both = docs.select(
      graft.pipeline.TextAnalysis.hashedEmbedding($"text", 16).as("fast"),
      graft.pipeline.TextAnalysis.hashedEmbeddingComposable($"text", 16).as("slow"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      // bit-exact: both are Σ-of-longs / P in the same order
      assert(r.getSeq[Double](0) === r.getSeq[Double](1))
    }
  }

  test("misra-gries: MG bound holds under arbitrary streams, splits, " +
      "merge trees and serde round-trips (property)") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.types.StringType
    import org.apache.spark.unsafe.types.UTF8String
    import org.scalacheck.{Gen, Prop, Test => SCTest}

    // skewed alphabet: a few hot items + a tail, plus occasional nulls
    val genItem: Gen[String] = Gen.frequency(
      (6, Gen.oneOf("a", "b", "c")),
      (3, Gen.choose(0, 40).map("w" + _)),
      (1, Gen.const(null)))
    val prop = Prop.forAll(
      Gen.listOf(genItem), Gen.choose(1, 8), Gen.choose(1, 6)) {
      (stream, k, nParts) =>
        val mg = graft.functions.MisraGries(
          BoundReference(0, StringType, nullable = true), k)
        // split into nParts partials, serde-round-trip each (the shuffle
        // path), then left-fold merge — an arbitrary-shape merge tree
        val chunkSize = math.max(1, (stream.size + nParts - 1) / nParts)
        val merged = stream.grouped(chunkSize).map { chunk =>
          val b = mg.createAggregationBuffer()
          chunk.foreach { s =>
            mg.update(b, InternalRow(
              if (s == null) null else UTF8String.fromString(s)))
          }
          mg.deserialize(mg.serialize(b))
        }.foldLeft(mg.createAggregationBuffer())(mg.merge)
        val reported = mg.eval(merged)
          .asInstanceOf[org.apache.spark.sql.catalyst.util.GenericArrayData]
          .array.map { e =>
            val r = e.asInstanceOf[InternalRow]
            r.getUTF8String(0).toString -> r.getLong(1)
          }
        val nonNull = stream.filter(_ != null)
        val n = nonNull.size.toLong
        val exact = nonNull.groupBy(identity).map { case (s, xs) =>
          s -> xs.size.toLong }
        // ≤ k counters; ĉ ≤ c; undercount ≤ N/(k+1); heavy items reported
        val le_k = reported.length <= k
        val bounds = reported.forall { case (item, est) =>
          val c = exact.getOrElse(item, 0L)
          est <= c && (c - est) * (k + 1) <= n
        }
        val covered = exact.forall { case (item, c) =>
          c * (k + 1) <= n || reported.exists(_._1 == item)
        }
        val sorted = reported.sameElements(
          reported.sortBy { case (item, c) => (-c, item) })
        le_k && bounds && covered && sorted
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(res.passed, s"scalacheck: ${res.status}")
  }

  test("hashed_embedding skips null array elements (SQL surface)") {
    // registered in SQL, so arrays with null elements can reach it —
    // a null element must contribute nothing, not NPE the task
    graft.functions.GraftFunctions.registerAll(spark) // idempotent; keeps
    // this test independent of suite ordering
    val r = spark.sql(
      """SELECT hashed_embedding(array('a', CAST(NULL AS STRING), 'b'), 4) AS e,
                hashed_embedding(array('a', 'b'), 4) AS f""").head()
    assert(r.getSeq[Double](0) === r.getSeq[Double](1))
  }
}
