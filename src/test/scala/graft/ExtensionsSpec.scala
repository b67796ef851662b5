package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** [[GraftExtensions]] — the `spark.sql.extensions` injection point.
  * Verifies the custom expressions resolve by name in a session the
  * application code never touched (no `registerAll`), and that the
  * registration survives `newSession()` clones — the property temp
  * functions lack and the reason the extensions class exists.
  */
class ExtensionsSpec extends AnyFunSuite {

  test("injected functions resolve in a fresh session and survive newSession()") {
    val base = TestSpark.spark // ensure the shared context exists first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[4]")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      assert(s2 ne base)

      val c = s2.sql(
        "SELECT cosine_similarity(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS c")
        .head().getDouble(0)
      assert(math.abs(c - 1.0) < 1e-12)

      val sh = s2.sql("SELECT ngram_shingles(split('a b c d', ' '), 3) AS sh")
        .head().getSeq[String](0)
      assert(sh === Seq("a b c", "b c d"))

      val bk = s2.sql(
        "SELECT lsh_buckets(array(cast(0.3 as float), cast(-0.7 as float)), 4, 2) AS bk")
        .head().getSeq[Long](0)
      assert(bk.length === 2 && bk(0) < 16 && bk(1) >= 16 && bk(1) < 32)

      // path_under_set arrives as CreateArray of literals (resolution runs
      // before constant folding) — the stringSeqLit bridge must accept it
      val p = s2.sql(
        """SELECT path_under_set('/a/b/c', array('/a/b')) AS under,
                  path_under_set('/a/b',   array('/a/b')) AS self""").head()
      assert(p.getBoolean(0), "proper ancestor must match")
      assert(!p.getBoolean(1), "the path itself is not its own ancestor")

      // hashed_embedding: same tokens → same vector, dims honored, and the
      // mean-centered components of a single token sum to ~0 ⇒ non-trivial
      val he = s2.sql(
        "SELECT hashed_embedding(split('a b a', ' '), 8) AS e1, " +
        "hashed_embedding(split('a b a', ' '), 8) AS e2").head()
      assert(he.getSeq[Double](0).length === 8)
      assert(he.getSeq[Double](0) === he.getSeq[Double](1))

      // misra_gries resolves as an aggregate in plain SQL; k ≥ cardinality
      // means no decrement fires, so counts are exact
      val mg = s2.sql(
        "SELECT misra_gries(t, 4) AS sk FROM VALUES ('a'),('a'),('b') AS v(t)")
        .selectExpr("explode(sk) AS e").selectExpr("e.item", "e.cnt")
        .collect().map(r => (r.getString(0), r.getLong(1))).toMap
      assert(mg === Map("a" -> 2L, "b" -> 1L))

      // layout keys resolve at 2/3/4 arities (morton) and 2 (hilbert)
      val lk = s2.sql(
        "SELECT morton_code(5L, 3L), morton_code(5L, 3L, 9L), " +
          "morton_code(5L, 3L, 9L, 2L), hilbert_code(12345L, 54321L)").head()
      assert(lk.getLong(0) === graft.functions.MortonCode.interleave(5L, 3L))
      assert(lk.getLong(1) ===
        graft.functions.MortonCode.interleave3(5L, 3L, 9L))
      assert(lk.getLong(2) ===
        graft.functions.MortonCode.interleave4(5L, 3L, 9L, 2L))
      assert(lk.getLong(3) ===
        graft.functions.HilbertCode.index16(12345L, 54321L))

      // quantile digest family in plain SQL: build a per-group digest,
      // re-merge the two groups, query + count from the merged image.
      // 1..8 fully sampled at this size → the median query is exact
      val qd = s2.sql(
        """WITH seg AS (SELECT g, quantile_digest_agg(v) AS digest
             FROM VALUES (0, 1), (0, 2), (0, 3), (0, 4),
                         (1, 5), (1, 6), (1, 7), (1, 8) AS t(g, v)
             GROUP BY g)
           SELECT quantile_digest_count(m) AS n,
                  quantile_digest_query(m, 0.5d) AS p50
           FROM (SELECT quantile_digest_merge_agg(digest) AS m FROM seg)""")
        .head()
      assert(qd.getLong(0) === 8L)
      assert(qd.getDouble(1) === 4.0)

      // trim rides the same SQL door: count is preserved, the trimmed
      // image still answers (fully-sampled here, so the median is exact)
      val qt = s2.sql(
        """WITH seg AS (SELECT quantile_digest_agg(v) AS digest
             FROM VALUES (1), (2), (3), (4) AS t(v))
           SELECT quantile_digest_count(tr) AS n,
                  quantile_digest_query(tr, 0.5d) AS p50
           FROM (SELECT quantile_digest_trim(digest, 0.1d) AS tr FROM seg)""")
        .head()
      assert(qt.getLong(0) === 4L)
      assert(qt.getDouble(1) >= 1.0 && qt.getDouble(1) <= 3.0)

      // non-literal plan-shaping parameter is a resolution-time error
      intercept[Exception] {
        s2.sql("SELECT ngram_shingles(split('a b', ' '), cast(rand() * 2 as int))")
          .collect()
      }

      val s3 = s2.newSession()
      val sh3 = s3.sql("SELECT ngram_shingles(split('x y', ' '), 2) AS sh")
        .head().getSeq[String](0)
      assert(sh3 === Seq("x y"))
    } finally {
      SparkSession.setActiveSession(base)
      SparkSession.setDefaultSession(base)
    }
  }

  test("naive BETWEEN range join rewrites to a bucketized equi-join") {
    val base = TestSpark.spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[4]")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      import s2.implicits._
      val H = 3600L * 1000000000L
      // 5k points over ~14 h; 6 intervals incl. an invalid (s > e) one and
      // a negative-start one (floor-div correctness for negatives)
      val points = (0 until 5000).map(i => (i.toLong, i * 10000000000L))
        .toDF("pid", "ts")
      val ivs = Seq(
        (1L, 0L, H), (2L, H / 2, 2 * H), (3L, 10 * H, 11 * H),
        (4L, 2 * H, H),            // invalid: start > end, matches nothing
        (5L, -H, H / 4),           // negative start
        (6L, 13 * H, 20 * H))
        .toDF("iid", "s", "e")
      points.createOrReplaceTempView("pts")
      ivs.createOrReplaceTempView("ivs")
      val q = s2.sql(
        "SELECT pid, iid FROM pts JOIN ivs ON ts BETWEEN s AND e")
      val plan = q.queryExecution.executedPlan.toString
      // the main branch is the bucketized equi-join; the whale branch
      // (runtime-empty here, AQE removes it on execution) is the only
      // place a nested-loop may remain
      assert(plan.contains("__graft_bucket"),
        s"expected the bucket equi-key:\n$plan")
      assert("BroadcastNestedLoop".r.findAllIn(plan).size <= 1,
        s"only the whale fallback branch may nest-loop:\n$plan")
      assert(plan.contains("Generate explode"),
        s"expected the interval bucket explode:\n$plan")
      val got = q.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      // ground truth from the un-rewritten plan
      s2.conf.set(graft.plans.RangeJoinRewrite.EnabledKey, "false")
      val naive = s2.sql(
        "SELECT pid, iid FROM pts JOIN ivs ON ts BETWEEN s AND e")
      assert(naive.queryExecution.executedPlan.toString
        .contains("BroadcastNestedLoop"), "kill switch must restore BNLJ")
      val want = naive.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      s2.conf.unset(graft.plans.RangeJoinRewrite.EnabledKey)
      assert(got === want,
        s"rewritten join changed results: ${got.size} vs ${want.size} pairs")
      assert(want.nonEmpty && !want.exists(_._2 == 4L))

      // a join that already has an equi key is left alone (the rewrite
      // would only add fan-out to an already-hashable join)
      val eq = s2.sql("SELECT pid, iid FROM pts JOIN ivs " +
        "ON pid = iid AND ts BETWEEN s AND e")
      assert(!eq.queryExecution.executedPlan.toString.contains("__graft_bucket"),
        "equi-keyed joins must not be rewritten")

      // inline-interval spelling: the upper bound is an EXPRESSION over
      // the interval side, not a column — must still rewrite
      val inline = "SELECT pid, iid FROM pts JOIN ivs " +
        "ON ts >= s AND ts <= s + 3600000000000"
      val qi = s2.sql(inline)
      assert(qi.queryExecution.executedPlan.toString.contains("__graft_bucket"),
        "expression bounds must rewrite too")
      val gotI = qi.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      s2.conf.set(graft.plans.RangeJoinRewrite.EnabledKey, "false")
      val wantI = s2.sql(inline).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      s2.conf.unset(graft.plans.RangeJoinRewrite.EnabledKey)
      assert(gotI === wantI && gotI.nonEmpty)

      // randomized equivalence sweep: seeded points/intervals with
      // negatives and degenerate spans, across bucket widths that divide
      // the data unevenly — the rewrite must be invisible at every width
      val rnd = new scala.util.Random(7)
      val rPts = (0 until 2000).map(i =>
        (i.toLong, rnd.between(-500000L, 500000L))).toDF("pid", "ts")
      val rIvs = (0 until 200).map { i =>
        val a = rnd.between(-500000L, 500000L)
        val b = a + rnd.between(-1000L, 50000L) // some invalid (b < a)
        (i.toLong, a, b)
      }.toDF("iid", "s", "e")
      rPts.createOrReplaceTempView("rpts")
      rIvs.createOrReplaceTempView("rivs")
      def pairs() = s2.sql(
        "SELECT pid, iid FROM rpts JOIN rivs ON ts BETWEEN s AND e")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      s2.conf.set(graft.plans.RangeJoinRewrite.EnabledKey, "false")
      val truth = pairs()
      s2.conf.unset(graft.plans.RangeJoinRewrite.EnabledKey)
      assert(truth.size > 1000, s"weak fixture: ${truth.size} pairs")
      // 0 and negative exercise the clamp: a misconfigured width must
      // not become silently-empty results
      for (w <- Seq(0L, -5L, 1L, 7L, 1000L, 99991L)) {
        s2.conf.set(graft.plans.RangeJoinRewrite.WidthKey, w.toString)
        assert(pairs() === truth, s"width $w changed results")
      }
      s2.conf.unset(graft.plans.RangeJoinRewrite.WidthKey)
    } finally {
      SparkSession.setActiveSession(base)
      SparkSession.setDefaultSession(base)
    }
  }

  test("whale intervals route through the capped fallback branch, not the explode") {
    val base = TestSpark.spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[4]")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      import s2.implicits._
      // a WHALE: span 10^15 at width 1 → 10^15 buckets; the pre-cap
      // rewrite would hand Sequence a 10^15-element range (hard failure
      // past ~2^31, row explosion long before). With the cap the whale
      // takes the original-join branch and the query completes exactly.
      val points = (0 until 1000).map(i => (i.toLong, i * 1000000L))
        .toDF("pid", "ts")
      val ivs = Seq(
        (1L, 0L, 1000000000000000L), // whale at any sane width
        (2L, 5000000L, 6000000L),    // normal
        (3L, -1000L, 2000000L))      // normal, negative start
        .toDF("iid", "s", "e")
      points.createOrReplaceTempView("wpts")
      ivs.createOrReplaceTempView("wivs")
      val sql = "SELECT pid, iid FROM wpts JOIN wivs ON ts BETWEEN s AND e"
      def pairs() = s2.sql(sql).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      s2.conf.set(graft.plans.RangeJoinRewrite.EnabledKey, "false")
      val truth = pairs()
      s2.conf.unset(graft.plans.RangeJoinRewrite.EnabledKey)
      assert(truth.count(_._2 == 1L) === 1000, "whale covers every point")
      // width 1 ns: every interval is a whale unless capped — the old
      // rewrite dies here; the capped one must match truth
      s2.conf.set(graft.plans.RangeJoinRewrite.WidthKey, "1")
      assert(pairs() === truth, "width=1 with whales changed results")
      s2.conf.unset(graft.plans.RangeJoinRewrite.WidthKey)
      // tiny cap: EVERY interval becomes a whale → pure fallback path,
      // still exact (graceful degradation to the pre-rewrite plan)
      s2.conf.set(graft.plans.RangeJoinRewrite.MaxFanoutKey, "1")
      assert(pairs() === truth, "cap=1 (all-whale) changed results")
      s2.conf.unset(graft.plans.RangeJoinRewrite.MaxFanoutKey)
      // overlap shape with a whale on one side
      Seq((10L, 0L, 1000000000000000L), (11L, 100L, 200L))
        .toDF("iid", "ls", "le").createOrReplaceTempView("wliv")
      Seq((20L, 50L, 150L), (21L, 500000000000L, 500000000001L))
        .toDF("jid", "rs", "re").createOrReplaceTempView("wriv")
      val osql = "SELECT iid, jid FROM wliv JOIN wriv ON ls <= re AND rs <= le"
      def opairs() = s2.sql(osql).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      s2.conf.set(graft.plans.RangeJoinRewrite.EnabledKey, "false")
      val otruth = opairs()
      s2.conf.unset(graft.plans.RangeJoinRewrite.EnabledKey)
      s2.conf.set(graft.plans.RangeJoinRewrite.WidthKey, "1")
      assert(opairs() === otruth, "overlap whales changed results")
      s2.conf.unset(graft.plans.RangeJoinRewrite.WidthKey)
    } finally {
      SparkSession.setActiveSession(base)
      SparkSession.setDefaultSession(base)
    }
  }

  test("naive interval-overlap join rewrites to the canonical-bucket equi-join") {
    val base = TestSpark.spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[4]")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      import s2.implicits._
      val rnd = new scala.util.Random(13)
      def ivs(n: Int, idBase: Long) = (0 until n).map { i =>
        val a = rnd.between(-100000L, 100000L)
        (idBase + i, a, a + rnd.between(-500L, 20000L)) // some invalid
      }
      ivs(300, 0L).toDF("iid", "ls", "le").createOrReplaceTempView("liv")
      ivs(300, 1000L).toDF("jid", "rs", "re").createOrReplaceTempView("riv")
      val sql = "SELECT iid, jid FROM liv JOIN riv ON ls <= re AND rs <= le"
      val q = s2.sql(sql)
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("__graft_bucket"),
        s"expected the bucket equi-key:\n$plan")
      assert("BroadcastNestedLoop".r.findAllIn(plan).size <= 2,
        s"only the two whale fallback branches may nest-loop:\n$plan")
      assert(plan.contains("Generate explode"),
        s"expected both-side bucket explodes:\n$plan")
      def pairs() = s2.sql(sql).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val got = pairs()
      s2.conf.set(graft.plans.RangeJoinRewrite.EnabledKey, "false")
      val truth = pairs()
      s2.conf.unset(graft.plans.RangeJoinRewrite.EnabledKey)
      assert(truth.size > 5000, s"weak fixture: ${truth.size} pairs")
      assert(got === truth,
        s"rewritten overlap changed results: ${got.size} vs ${truth.size}")
      // exactly-once across widths (a duplicate would surface as a bag
      // mismatch — compare with multiplicity via counts)
      for (w <- Seq(13L, 5000L, 999983L)) {
        s2.conf.set(graft.plans.RangeJoinRewrite.WidthKey, w.toString)
        val cnt = s2.sql(sql).count()
        assert(cnt === truth.size, s"width $w emitted $cnt of ${truth.size}")
      }
      s2.conf.unset(graft.plans.RangeJoinRewrite.WidthKey)
    } finally {
      SparkSession.setActiveSession(base)
      SparkSession.setDefaultSession(base)
    }
  }
}
