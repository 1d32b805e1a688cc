package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.operators.TextAnalysis

/** Property tests (SURVEY.md §5): invariants of the text pipeline over
  * generated corpora, driven by seeded ScalaCheck generators (the
  * scalatest/scalacheck bridge isn't in the offline cache, so sampling is
  * explicit and deterministic).
  *
  *  - token conservation: Σ per-word counts == total exploded tokens;
  *  - language-ID totality: every doc maps to exactly one prediction;
  *  - fingerprint clustering: Σ bucket n_docs == corpus size and
  *    n_exact_dups == n_docs - n_distinct in every bucket.
  */
class TextPropertiesSpec extends SparkSpec {

  private val word = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString).map(_.take(8))
  private val doc = Gen.chooseNum(0, 40).flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))
  private val corpusGen = Gen.listOfN(60, doc)

  private def corpora: Seq[Seq[String]] =
    (1 to 5).map(i => corpusGen.apply(Gen.Parameters.default, Seed(42L + i)).get)

  test("token conservation: sum of word counts == total tokens") {
    import spark.implicits._
    corpora.foreach { docs =>
      val df = docs.toDF("text")
      val words = df.select(explode(split(col("text"), " ")).as("w"))
        .filter(length(col("w")) > 0)
      val total = words.count()
      val summed = words.groupBy(col("w")).count()
        .agg(sum(col("count"))).head().getLong(0)
      assert(summed == total)
      val localTotal = docs.map(_.split(" ").count(_.nonEmpty)).sum
      assert(total == localTotal, "Spark tokenization disagrees with local split")
    }
  }

  test("RAKE invariants: no stopword ever enters a phrase, lengths capped, scores consistent") {
    val rows = TextAnalysis.queries("text_rake_keywords")(spark, sf0001).collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      val phrase = r.getString(0)
      val nWords = r.getLong(1)
      val words = phrase.split(" ")
      assert(words.length.toLong == nWords, s"n_words mismatch: $r")
      assert(nWords >= 1 && nWords <= 4, s"cap violated: $r")
      assert(!words.exists(Set("the", "a")), s"stopword in phrase: $phrase")
      // deg/freq ∈ [1, 4] per word under the cap → phrase score in
      // [n·1e6, n·4e6]
      val score = r.getLong(3)
      assert(score >= nWords * 1000000L && score <= nWords * 4000000L,
        s"score outside the deg/freq band: $r")
    }
  }

  test("span corruption: sides partition the tokens and sentinels agree") {
    val rows = TextAnalysis.queries("pipe_span_corruption")(spark, sf0001)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nTok, nMask, nSpans) = (r.getLong(1), r.getLong(2), r.getLong(3))
      val inp = r.getString(4).split(" ").filter(_.nonEmpty)
      val tgt = r.getString(5).split(" ").filter(_.nonEmpty)
      val inpSent = inp.count(_.startsWith("<X"))
      val tgtSent = tgt.count(_.startsWith("<X"))
      assert(inpSent == nSpans && tgtSent == nSpans, s"sentinel counts: $r")
      // input keeps (n_tokens − n_masked) words + one sentinel per span;
      // target holds the n_masked words + its sentinels
      assert(inp.length.toLong == nTok - nMask + nSpans, s"input side: $r")
      assert(tgt.length.toLong == nMask + nSpans, s"target side: $r")
    }
  }

  test("language-ID totality: every doc classified exactly once") {
    import spark.implicits._
    corpora.foreach { docs =>
      val df = docs.toDF("text")
      val v = size(filter(split(col("text"), " "), t => t.isin(lit("the"), lit("a"))))
      val predicted = df.withColumn("p",
        when(v > 0, "articleish").otherwise("other"))
      assert(predicted.filter(col("p").isNull).count() == 0)
      assert(predicted.groupBy(col("p")).count()
        .agg(sum(col("count"))).head().getLong(0) == docs.size)
    }
  }

  test("fingerprint buckets partition the corpus; dup arithmetic consistent") {
    import spark.implicits._
    // plant guaranteed duplicates: corpus ++ first 10 docs again
    val docs = corpora.head ++ corpora.head.take(10)
    val df = docs.toDF("text")
    val buckets = df.withColumn("fp", md5(trim(lower(col("text")))))
      .groupBy(substring(col("fp"), 1, 1).as("bucket"), col("fp"))
      .agg(count(lit(1)).as("n_fp"))
      .groupBy(col("bucket"))
      .agg(sum(col("n_fp")).as("n_docs"), count(lit(1)).as("n_distinct"),
        (sum(col("n_fp")) - count(lit(1))).as("n_exact_dups"))
      .collect()
    assert(buckets.map(_.getAs[Long]("n_docs")).sum == docs.size)
    buckets.foreach { r =>
      assert(r.getAs[Long]("n_exact_dups") ==
        r.getAs[Long]("n_docs") - r.getAs[Long]("n_distinct"))
      assert(r.getAs[Long]("n_exact_dups") >= 0)
    }
    assert(buckets.map(_.getAs[Long]("n_exact_dups")).sum >= 1,
      "planted duplicates not detected")
  }

  test("bpe round: relational greedy rewrite equals the imperative reference on random words") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    // the trusted 6-line sequential greedy (the semantics BPE specifies):
    // scan left-to-right, merge on match, skip the consumed symbol
    def greedy(syms: List[String], a: String, b: String): List[String] = {
      val out = scala.collection.mutable.ListBuffer[String]()
      var i = 0
      while (i < syms.length) {
        if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
          out += (a + b); i += 2
        } else { out += syms(i); i += 1 }
      }
      out.toList
    }
    // small alphabet makes same-symbol runs (the overlap edge) common
    val wordGen = Gen.chooseNum(1, 12)
      .flatMap(n => Gen.listOfN(n, Gen.oneOf("a", "b", "c"))).map(_.mkString)
    (1 to 4).foreach { trial =>
      val words = Gen.listOfN(40, wordGen)
        .apply(Gen.Parameters.default, Seed(900L + trial)).get.distinct
      val s = words.toDF("word")
        .withColumn("cnt", lit(1L))
        .select(col("word"), col("cnt"),
          posexplode(transform(sequence(lit(1), length(col("word"))), i =>
            col("word").substr(i, lit(1)))))
        .select(col("word"), col("cnt"), (col("pos") + 1).as("pos"), col("col").as("sym"))
      val (bestDf, next) = TextAnalysis.bpeRound(s)
      val best = bestDf.collect().head
      val (a, b) = (best.getString(0), best.getString(1))
      val rewritten = next.orderBy(col("word"), col("pos")).collect()
        .groupBy(_.getString(0)).view.mapValues(_.map(_.getString(3)).toList).toMap
      words.foreach { w =>
        val expect = greedy(w.map(_.toString).toList, a, b)
        val got = rewritten.getOrElse(w, Nil)
        assert(got == expect, s"trial $trial word '$w' merge ($a,$b): got $got expected $expect")
        // mass conservation: the symbols still spell the word
        assert(got.mkString == w, s"word '$w' no longer spelled by its symbols: $got")
      }
      next.unpersist()
    }
  }
}
