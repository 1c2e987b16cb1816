package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** Distributed deduplication operators for document corpora.
  *
  * Four families, in increasing scale-sophistication:
  *  - exact: hash-groupBy on the raw text (one shuffle);
  *  - n-gram Jaccard: shingle-postings self-join — exact pairwise
  *    similarity, cost ~ sum over grams of df(gram)^2;
  *  - MinHash + LSH banding: signature agg (one shuffle) + band-bucket
  *    join — candidate generation is linear in corpus size, the 100 TB
  *    path (the shingle join above is the verifier on candidates only);
  *  - SimHash: 64-bit signature, banded by 16-bit quarters (pigeonhole:
  *    hamming<=3 guaranteed candidate; wider radii still high-recall),
  *    verify with bit_count(xor).
  *
  * All signatures are built from xxhash64 (stable across runs/executors),
  * so results are deterministic — required by the driver's repeated
  * verify runs. No UDFs: signature math is shiftright/pmod/bitwise
  * expressions, codegen-friendly.
  */
object DedupOps {

  /** Mersenne-ish modulus and deterministic affine hash family for
    * MinHash: h_i(x) = (a_i * (x mod M) + b_i) mod M, a_i odd.
    * Constants from a fixed LCG so every run/partition agrees. */
  private val M = 2147483647L // 2^31 - 1
  private def hashFamily(k: Int): Seq[(Long, Long)] = {
    var state = 88172645463325252L
    def next(): Long = { // xorshift64, fixed seed — deterministic
      state ^= state << 13; state ^= state >>> 7; state ^= state << 17
      state & Long.MaxValue
    }
    Seq.fill(k)(((next() % (M - 2)) + 1 | 1L, next() % M))
  }

  /** distinct (doc_id, shingle) postings with a stable 31-bit shingle id */
  def shinglePostings(docs: DataFrame, n: Int): DataFrame =
    docs.withColumn("toks", tokens("text"))
      .select(col("doc_id"), explode(wordNgrams("toks", n)).as("gram"))
      .distinct()
      .withColumn("gram_id", pmod(xxhash64(col("gram")), lit(M)))

  /** exact pairwise n-gram Jaccard >= minJaccard over all doc pairs.
    * At 100 TB run this only on LSH candidates (see minHashCandidates) —
    * kept as its own operator because it IS the exact verifier. */
  def ngramJaccardPairs(docs: DataFrame, n: Int, minJaccard: Double): DataFrame = {
    val posts = shinglePostings(docs, n).select("doc_id", "gram_id")
    val sizes = posts.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val common = posts.as("a")
      .join(posts.as("b"),
        col("a.gram_id") === col("b.gram_id") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("common"))
    common
      .join(sizes.as("sa"), col("doc_a") === col("sa.doc_id"))
      .join(sizes.as("sb"), col("doc_b") === col("sb.doc_id"))
      .select(col("doc_a"), col("doc_b"),
        (col("common").cast("double") /
          (col("sa.sz") + col("sb.sz") - col("common"))).as("jaccard"))
      .filter(col("jaccard") >= minJaccard)
  }

  /** per-doc MinHash signature: k min-hashes over shingle ids (single
    * groupBy — partial min aggregation is map-side combined) */
  def minHashSignatures(docs: DataFrame, n: Int, k: Int): DataFrame = {
    val posts = shinglePostings(docs, n)
    val mins = hashFamily(k).zipWithIndex.map { case ((a, b), i) =>
      min(pmod(lit(a) * col("gram_id") + lit(b), lit(M))).as(s"mh_$i")
    }
    posts.groupBy("doc_id").agg(mins.head, mins.tail: _*)
  }

  /** LSH banding: docs sharing any (band, band-signature) bucket.
    * bands * rowsPerBand must equal k of the signature. */
  def minHashCandidates(sigs: DataFrame, bands: Int, rowsPerBand: Int): DataFrame = {
    val bandCols = (0 until bands).map { bnd =>
      val rows = (0 until rowsPerBand).map(r => col(s"mh_${bnd * rowsPerBand + r}"))
      struct(lit(bnd).as("band"), xxhash64(rows: _*).as("sig"))
    }
    val buckets = sigs
      .select(col("doc_id"), explode(array(bandCols: _*)).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.sig").as("sig"))
    buckets.as("a")
      .join(buckets.as("b"),
        col("a.band") === col("b.band") && col("a.sig") === col("b.sig") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
  }

  /** MinHash-LSH near-dup pairs, exact-verified: LSH candidates
    * (linear-ish) -> exact Jaccard on candidates only (the 100 TB
    * shape: no all-pairs join ever materializes). */
  def minHashNearDups(docs: DataFrame, n: Int, k: Int, bands: Int,
                      minJaccard: Double): DataFrame = {
    val cands = minHashCandidates(minHashSignatures(docs, n, k), bands, k / bands)
    val posts = shinglePostings(docs, n).select("doc_id", "gram_id")
    val sizes = posts.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    cands.as("c")
      .join(posts.as("a"), col("c.doc_a") === col("a.doc_id"))
      .join(posts.as("b"),
        col("c.doc_b") === col("b.doc_id") && col("a.gram_id") === col("b.gram_id"))
      .groupBy(col("c.doc_a").as("doc_a"), col("c.doc_b").as("doc_b"))
      .agg(count(lit(1)).as("common"))
      .join(sizes.as("sa"), col("doc_a") === col("sa.doc_id"))
      .join(sizes.as("sb"), col("doc_b") === col("sb.doc_id"))
      .select(col("doc_a"), col("doc_b"),
        (col("common").cast("double") /
          (col("sa.sz") + col("sb.sz") - col("common"))).as("jaccard"))
      .filter(col("jaccard") >= minJaccard)
  }

  /** 64-bit SimHash per doc from distinct-token xxhash64s: bit k of the
    * signature is the sign of sum over tokens of (+-1 for bit k). */
  def simHashSignatures(docs: DataFrame): DataFrame = {
    val toks = docs.withColumn("toks", tokens("text"))
      .select(col("doc_id"), explode(expr("array_distinct(toks)")).as("tok"))
      .withColumn("th", xxhash64(col("tok")))
    val bitSums = (0 until 64).map { k =>
      sum(when(shiftright(col("th"), k).bitwiseAND(1) === 1, 1).otherwise(-1))
        .as(s"s_$k")
    }
    val sums = toks.groupBy("doc_id").agg(bitSums.head, bitSums.tail: _*)
    val sig = (0 until 64).map { k =>
      when(col(s"s_$k") > 0, shiftleft(lit(1L), k)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))
    sums.select(col("doc_id"), sig.as("simhash"))
  }

  /** near-dup pairs with hamming(simhash) <= maxHamming, banded by the
    * four 16-bit quarters so candidate generation joins on equality
    * (guaranteed recall for hamming <= 3, high recall beyond). */
  def simHashNearDups(docs: DataFrame, maxHamming: Int): DataFrame = {
    val sigs = simHashSignatures(docs)
    val banded = sigs.select(col("doc_id"), col("simhash"),
      explode(array((0 until 4).map(b =>
        struct(lit(b).as("band"),
          shiftright(col("simhash"), b * 16).bitwiseAND(0xFFFFL).as("key"))): _*))
        .as("bk"))
      .select(col("doc_id"), col("simhash"),
        col("bk.band").as("band"), col("bk.key").as("key"))
    banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}
