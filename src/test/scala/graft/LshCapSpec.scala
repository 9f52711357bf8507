package graft

import org.apache.spark.sql.functions._

import graft.queries.ContentQueries

/** Adversarial-corpus guards for the shared LSH candidate pipeline
  * (q19 → q21/q32/q33/q44): candidate volume must stay O(k) on a corpus
  * with k identical documents (exact-dup star links, not a k²/2 clique),
  * and the band-group frequency cap must disarm near-identical-but-
  * distinct boilerplate clusters — the two inputs on which the uncapped
  * self-join was quadratic in the largest cluster.
  */
class LshCapSpec extends SparkSuite {

  /** Write a synthetic documents.parquet with the test-data schema. */
  private def corpus(rows: Seq[(Long, String)]): String = {
    import spark.implicits._
    val dir = tmpDir("lshcap")
    rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
      .withColumn("source", lit("synthetic"))
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private val base =
    "the quick brown fox jumps over the lazy dog while the merge scan " +
      "filter join query table runs across the wide cluster of nodes"

  test("10k identical docs: candidate volume is O(k) star links, not k^2/2 clique") {
    val k = 10000
    val distinctDocs = (0 until 50).map(i => ((k + i).toLong, s"$base unique tail $i of doc $i"))
    val dir = corpus((0 until k).map(i => (i.toLong, base)) ++ distinctDocs)
    val cand = SparkEntry.queries("q19_dedup_minhash_lsh")(spark, dir)
    val n = cand.count()
    // star links: exactly k-1 pairs for the identical group; 51 docs
    // enter banding (50 distinct + the group's representative), adding at
    // most 51*50/2 LSH pairs
    assert(n >= (k - 1).toLong, s"identical group must stay linked (got $n)")
    assert(n <= (k - 1).toLong + 51L * 50 / 2,
      s"candidate volume must be O(k), got $n for k=$k (clique would be ${k.toLong * (k - 1) / 2})")
    // every identical-group member links to the group's min doc_id
    val star = cand.filter(col("idb") < k).agg(
      count(lit(1)).as("n"), max(col("ida")).as("maxIda")).head()
    assert(star.getLong(0) == (k - 1).toLong)
    assert(star.getLong(1) == 0L, "star centre must be the min doc_id of the group")
    // downstream: clusters put all k identical docs in one component
    val clusters = SparkEntry.queries("q33_dedup_clusters")(spark, dir)
    val c0 = clusters.filter(col("doc_id") < k).select("cluster_id").distinct().collect()
    assert(c0.length == 1 && c0.head.getLong(0) == 0L)
  }

  test("near-identical boilerplate: band-group cap bounds the self-join") {
    // k docs sharing a long common prefix with a unique suffix word:
    // NOT exact duplicates, so they all enter banding, and most band
    // signatures coincide -> hot (band, bv) groups of ~k members.
    val k = 600
    assert(k > ContentQueries.LshBandGroupCap)
    val longBase = (base + " ") * 4
    val dir = corpus((0 until k).map(i => (i.toLong, s"$longBase boilerplate variant $i")))
    val cand = SparkEntry.queries("q19_dedup_minhash_lsh")(spark, dir)
    val n = cand.count()
    assert(ContentQueries.lastLshDrop._1 > 0L,
      "the frequency cap must have dropped at least one hot band group")
    assert(n < k.toLong * (k - 1) / 4,
      s"capped candidate volume must be far below the ${k.toLong * (k - 1) / 2} clique, got $n")
  }

  test("clean corpus: cap does not engage and results match the uncapped shape") {
    val dir = "/root/testdata/sf0.001"
    // drop any memoized pipeline another suite built for this dir, so the
    // build (and its lastLshDrop diagnostic) actually runs here
    ContentQueries.clearShared(spark)
    val n = SparkEntry.queries("q19_dedup_minhash_lsh")(spark, dir).count()
    assert(ContentQueries.lastLshDrop._1 == 0L,
      "no band group of the synthetic test corpus may exceed the cap")
    assert(n > 0)
  }
}
