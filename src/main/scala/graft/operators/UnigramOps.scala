package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Unigram-LM subword tokenizer TRAINING — the SentencePiece-shaped
  * alternative to BPE (Kudo 2018, "Subword Regularization: Improving
  * Neural Network Translation Models with Multiple Subword
  * Candidates"): instead of greedily growing merges, seed a LARGE
  * candidate vocabulary, then alternate
  *
  *  - E-step: Viterbi-segment every word under the current piece
  *    scores (a per-word dynamic program over positions — row-local,
  *    expressed entirely in codegen'd higher-order functions:
  *    `aggregate` builds the cost/backpointer arrays, a second
  *    `aggregate` walks the backpointers out to the chosen pieces);
  *  - M-step: re-count piece usage over the segmented corpus (ONE
  *    keyed shuffle, the round's only exchange);
  *  - prune: keep the single-character floor (so every word stays
  *    segmentable) plus the top `keep` multi-character pieces by
  *    usage, `keep` shrinking 3/4 per round — Kudo's shrinking
  *    schedule with a deterministic (count DESC, piece ASC) tie-break.
  *
  * Distribution discipline is BPE's ([[BpeOps]]): train over the
  * VOCABULARY (distinct words with occurrence weights, one eager
  * localCheckpoint), never the raw corpus; the per-round model that
  * reaches the driver is piece->count — alphabet + `keep` entries,
  * KB-sized at any corpus scale — and rides back into the plan as one
  * map literal, so the E-step is an embarrassingly parallel map with
  * zero joins.
  *
  * DETERMINISM (the reason the objective is integer-valued): Viterbi
  * here minimizes the pair (piece count, -sum of piece usage counts),
  * encoded as `count * 2^40 - usage` in one BIGINT — maximum
  * likelihood under a length-penalized frequency surrogate rather
  * than float -log p. The float objective is a one-line cost swap,
  * but cross-engine `ln` ulp drift would make near-tie argmins
  * engine-dependent and the value-for-value DuckDB replay
  * ([[oracleSql]]) impossible to pin; the integer objective makes
  * every round of the EM chain bit-replayable. Ties between
  * same-cost segmentations break toward the LONGER last piece in
  * both engines (the CASE scans j = 4..1).
  *
  * Reference semantics to match: the t22/t25 train/encode discipline
  * (reference `nyc_taxi_etl.py` has no tokenizer; this is part of the
  * LLM-curation surface the engine adds).
  */
object UnigramOps {

  /** lexicographic (pieces, -usage) encoded in one bigint: a piece
    * costs Big minus its usage count, so fewer pieces always beats
    * higher usage, and usage breaks ties among equal-length
    * segmentations. Counts are corpus-bounded (<< 2^40), path sums
    * are <= MaxWordLen * Big (<< 2^63). */
  val Big: Long = 1L << 40

  /** cost of an unavailable transition — never chosen while the
    * single-char floor keeps every position reachable */
  val Huge: Long = 1L << 50

  /** default piece-length cap — gates t50/t51/t52 train at 4 (their
    * oracles replay this constant); production configs pass
    * `maxPieceLen` up to [[MaxTrainPieceLen]] explicitly (t54 gates 8
    * with the per-length seed pool) */
  val MaxPieceLen = 4

  /** hard ceiling on `maxPieceLen`: pieces cannot exceed the trained
    * word length, and the DP cost expression grows one branch per
    * length, so the cap keeps generated SQL (Spark HOF and DuckDB
    * replay alike) bounded */
  val MaxTrainPieceLen = 12

  val MaxWordLen = 16

  /** distinct words with occurrence weights — BPE's tokenization
    * exactly ([[BpeOps.vocab]]), plus the MaxWordLen training cap
    * (standard trainer practice; rare over-long words add DP depth,
    * not vocabulary signal) */
  def words(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs
      .select(explode(split(lower(col(textCol)), "[^a-z0-9]+")).as("word"))
      .filter(length(col("word")).between(1, MaxWordLen))
      .groupBy("word").agg(count(lit(1)).as("freq"))

  /** weighted single-character counts — the never-pruned vocab floor */
  private[graft] def charCounts(w: DataFrame): DataFrame =
    w.select(explode(expr(
        "transform(sequence(1, length(word)), i -> substring(word, i, 1))"))
        .as("piece"), col("freq"))
      .groupBy("piece").agg(sum(col("freq")).as("cnt"))

  /** weighted counts of every substring of length 2..maxPieceLen
    * (overlapping occurrences count — both engines enumerate start
    * positions identically) — the seed candidate pool */
  private[graft] def multiSeedCounts(
      w: DataFrame, maxPieceLen: Int = MaxPieceLen): DataFrame =
    w.select(explode(expr(s"""
        flatten(transform(sequence(2, $maxPieceLen), l ->
          filter(transform(sequence(1, length(word)),
                           s -> substring(word, s, l)),
                 p -> length(p) = l)))""")).as("piece"), col("freq"))
      .groupBy("piece").agg(sum(col("freq")).as("cnt"))

  /** transition cost for a piece of length `j` ending at position `i`
    * inside the dp lambda: dp[i-j] + (Big - usage), or Huge when the
    * substring is not in the vocab map (try_element_at: missing keys
    * are null, not an ANSI error) */
  private def costSql(j: Int): String =
    s"""(case when i >= $j and try_element_at(__vm,
            substring(word, i - $j + 1, $j)) is not null
          then element_at(acc.c, i - $j + 1)
            + (${Big}L - try_element_at(__vm, substring(word, i - $j + 1, $j)))
          else ${Huge}L end)"""

  /** Viterbi forward pass: one `aggregate` over positions 1..len
    * building dp costs `c` (c[k] = best cost of the first k-1 chars)
    * and backpointers `j` (chosen piece length per position); ties
    * prefer the longer piece (the CASE scans maxPieceLen..2 first) */
  private[graft] def dpSqlFor(maxPieceLen: Int): String = {
    val costs = (1 to maxPieceLen).map(costSql)
    val m = s"least(${costs.mkString(",\n            ")})"
    val choice = (maxPieceLen to 2 by -1)
      .map(j => s"when ${costs(j - 1)} = $m then ${j}L").mkString("\n          ")
    s"""aggregate(sequence(1, length(word)),
        named_struct('c', array(cast(0 as bigint)),
                     'j', array(cast(1 as bigint))),
        (acc, i) -> named_struct(
          'c', concat(acc.c, array($m)),
          'j', concat(acc.j, array(case $choice else 1L end))))"""
  }

  private[graft] lazy val dpSql: String = dpSqlFor(MaxPieceLen)

  /** backtrack: walk the backpointers from position len down to 0,
    * emitting the chosen pieces (at most len steps, so one aggregate
    * over the same sequence suffices; finished states pass through).
    * `arr` is the choice array to follow — `__dp.j` for greedy
    * Viterbi, `__sj` for the sampled choices ([[sampleChoiceSql]]);
    * both carry a dummy at index 1 so position p reads index p+1. */
  private[graft] def btSqlOn(arr: String): String =
    s"""aggregate(sequence(1, length(word)),
        named_struct('p', cast(length(word) as bigint),
                     'o', cast(array() as array<string>)),
        (acc, x) -> if(acc.p <= 0, acc, named_struct(
          'p', acc.p - element_at($arr, cast(acc.p + 1 as int)),
          'o', concat(acc.o, array(substring(word,
            cast(acc.p - element_at($arr, cast(acc.p + 1 as int)) + 1 as int),
            cast(element_at($arr, cast(acc.p + 1 as int)) as int)))))),
        acc -> acc.o)"""

  private[graft] lazy val btSql: String = btSqlOn("__dp.j")

  /** SAMPLED choice per position — subword regularization (Kudo 2018
    * §3: train with MULTIPLE segmentations drawn per epoch, not the
    * single Viterbi argmax). At each position i the candidate piece
    * lengths are those whose transition cost sits within `slack` of
    * the position's Viterbi minimum (the DP already holds both: cost
    * of length j = c[i-j+1] + Big - usage, and the minimum is
    * c[i+1]); the draw picks among them weighted by usage+1, using a
    * deterministic md5-derived uniform over (word, position, salt) —
    * the d18/t41 portable-hash discipline, so the DuckDB oracle
    * replays every draw bit-for-bit and DIFFERENT salts (epochs)
    * yield different segmentations.
    *
    * `slack` is the temperature analog in integer cost units: 0
    * samples only among exact Viterbi ties; values below [[Big]]
    * admit same-piece-count segmentations whose usage sum is within
    * slack; k*Big admits up to k extra pieces. The candidate set
    * always contains the argmax (its weight is >= 1), so the modulus
    * is never zero. Output array carries the btSql dummy at index 1. */
  private[graft] def sampleChoiceSql(maxPieceLen: Int, slack: Long,
      salt: String): String = {
    def usage(j: Int) =
      s"try_element_at(__vm, substring(word, i - $j + 1, $j))"
    def w(j: Int): String =
      s"""(case when i >= $j and ${usage(j)} is not null
            and element_at(__dp.c, i - $j + 1) + (${Big}L - ${usage(j)})
              <= element_at(__dp.c, i + 1) + ${slack}L
          then ${usage(j)} + 1L else 0L end)"""
    val ws = (1 to maxPieceLen).map(w)
    val cums = (1 to maxPieceLen)
      .map(k => ws.take(k).mkString("(", " + ", ")"))
    val u = s"""(cast(conv(substring(md5(cast(concat(word, ':',
        cast(i as string), ':$salt') as binary)), 1, 13), 16, 10)
        as bigint) % ${cums.last})"""
    val choice = (1 until maxPieceLen)
      .map(k => s"when $u < ${cums(k - 1)} then ${k}L")
      .mkString("\n          ")
    s"""concat(array(1L), transform(sequence(1, length(word)),
        i -> case $choice else ${maxPieceLen}L end))"""
  }

  /** sampled-segmentation piece counts over the word frame — the
    * regularized twin of [[segmentCounts]]: same forward DP, the
    * backtrack follows [[sampleChoiceSql]]'s draws instead of the
    * argmax backpointers. Still row-local, model as one map literal,
    * one keyed shuffle for the count. */
  def sampledSegmentCounts(w: DataFrame, vocab: Seq[(String, Long)],
      slack: Long, salt: String,
      maxPieceLen: Int = MaxPieceLen): DataFrame = {
    require(slack >= 0, s"slack must be >= 0, got $slack")
    require(salt.matches("[A-Za-z0-9_]+"),
      s"salt must match [A-Za-z0-9_]+ (it is embedded in generated " +
        s"SQL on both engines), got '$salt'")
    require(vocab.forall(_._2 < Big / MaxWordLen),
      s"unigram piece count >= ${Big / MaxWordLen} would invert the " +
        "integer Viterbi objective — raise UnigramOps.Big for this corpus")
    w.withColumn("__vm", typedLit(vocab.toMap))
      .withColumn("__dp", expr(dpSqlFor(maxPieceLen)))
      .withColumn("__sj", expr(sampleChoiceSql(maxPieceLen, slack, salt)))
      .select(explode(expr(btSqlOn("__sj"))).as("piece"), col("freq"))
      .groupBy("piece").agg(sum(col("freq")).as("cnt"))
  }

  /** train, then ONE sampled encode pass (an epoch's segmentation
    * draw): the t51 reporting contract (merged units, length >= 2)
    * under a `salt`-selected sample — run with a different salt per
    * epoch for Kudo's multiple-subword-candidates regularization. */
  def sampledEncodeCounts(docs: DataFrame, rounds: Int, slack: Long,
      salt: String, seedMulti: Int = 64,
      maxPieceLen: Int = MaxPieceLen, seedPerLen: Int = 0): DataFrame = {
    val w = words(docs).localCheckpoint()
    val vocab = trainOn(w, rounds, seedMulti, maxPieceLen, seedPerLen)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    sampledSegmentCounts(w, vocab, slack, salt, maxPieceLen)
      .filter(length(col("piece")) > 1)
      .select(col("piece"), col("cnt"))
  }

  /** E-step + M-step count: Viterbi-segment every word under `vocab`
    * and return weighted piece-usage counts. The vocab rides in as a
    * map literal (model-sized); the groupBy is the round's only
    * shuffle. */
  def segmentCounts(w: DataFrame, vocab: Seq[(String, Long)],
                    maxPieceLen: Int = MaxPieceLen): DataFrame = {
    // the integer objective inverts silently if any usage count reaches
    // Big (cost = Big - usage goes negative and the DP starts PREFERRING
    // more pieces) — fail loud at the model boundary instead. The
    // margin is MaxWordLen because a word sums at most MaxWordLen piece
    // costs; at a corpus where a piece's weighted usage approaches
    // 2^40 / 16, raise Big (both engines replay whatever constant is
    // compiled in — the oracle generator uses the same val)
    require(vocab.forall(_._2 < Big / MaxWordLen),
      s"unigram piece count >= ${Big / MaxWordLen} would invert the " +
        "integer Viterbi objective — raise UnigramOps.Big for this corpus")
    w.withColumn("__vm", typedLit(vocab.toMap))
      .withColumn("__dp", expr(dpSqlFor(maxPieceLen)))
      .select(explode(expr(btSql)).as("piece"), col("freq"))
      .groupBy("piece").agg(sum(col("freq")).as("cnt"))
  }

  private def validatePieceLen(maxPieceLen: Int): Unit =
    require(maxPieceLen >= 2 && maxPieceLen <= MaxTrainPieceLen,
      s"maxPieceLen must be in [2, $MaxTrainPieceLen], got $maxPieceLen")

  /** PER-LENGTH seed pool — the production-shape discipline for deep
    * piece lengths (the [[BpeOps.trainBatched]] idea applied to
    * seeding): one global top-N over substrings of length 2..8+ lets
    * the shortest (most frequent) lengths crowd out every longer
    * candidate, so a useful cap would have to grow with the length
    * range; taking the top `perLen` PER length keeps every length
    * represented with a driver transfer bounded at
    * perLen*(maxPieceLen-1) rows regardless of corpus or length range.
    * Physically: the substring counts materialize once
    * (localCheckpoint — they are re-read maxPieceLen-1 times), then
    * one TakeOrderedAndProject per length (never a global sort, never
    * a single-partition window over 7 length groups — the t39
    * histogram-split discipline). */
  private[graft] def seedPoolPerLen(w: DataFrame, perLen: Int,
      maxPieceLen: Int): Array[(String, Long)] = {
    require(perLen >= 1, s"seedPerLen must be >= 1, got $perLen")
    val sc = multiSeedCounts(w, maxPieceLen).localCheckpoint()
    try {
      (2 to maxPieceLen).flatMap { l =>
        sc.filter(length(col("piece")) === l)
          .orderBy(col("cnt").desc, col("piece").asc).limit(perLen)
          .collect().map(r => (r.getString(0), r.getLong(1)))
      }.toArray
    } finally sc.unpersist(false)
  }

  /** Train `rounds` EM rounds from the candidate pool; returns the
    * final vocab (piece, cnt) — every single character with its
    * last-round usage, plus the surviving top multi-char pieces.
    * Replayed value-for-value by [[oracleSql]] with the same
    * rounds/seed/maxPieceLen/seedPerLen.
    *
    * `seedPerLen = 0` (default): the global top-`seedMulti` pool —
    * t50's exact chain. `seedPerLen > 0`: the per-length pool
    * ([[seedPoolPerLen]]); `seedMulti` is then ignored and the shrink
    * schedule starts from perLen*(maxPieceLen-1). */
  def train(docs: DataFrame, rounds: Int, seedMulti: Int = 64,
            maxPieceLen: Int = MaxPieceLen, seedPerLen: Int = 0): DataFrame =
    trainOn(words(docs).localCheckpoint(), rounds, seedMulti,
      maxPieceLen, seedPerLen)

  /** training core over an already-materialized word frame — split out
    * so [[encodeCounts]] reuses the checkpointed vocabulary instead of
    * paying a second raw-corpus scan + word aggregation */
  private[graft] def trainOn(w: DataFrame, rounds: Int,
                      seedMulti: Int,
                      maxPieceLen: Int = MaxPieceLen,
                      seedPerLen: Int = 0): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    validatePieceLen(maxPieceLen)
    require(seedPerLen >= 0,
      s"seedPerLen must be >= 0 (0 = global top-seedMulti pool), " +
        s"got $seedPerLen")
    val chars = charCounts(w).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val seed =
      if (seedPerLen > 0) seedPoolPerLen(w, seedPerLen, maxPieceLen)
      else multiSeedCounts(w, maxPieceLen)
        .orderBy(col("cnt").desc, col("piece").asc).limit(seedMulti)
        .collect().map(r => (r.getString(0), r.getLong(1)))
    var vocab: Seq[(String, Long)] = (chars ++ seed).toSeq
    var keep =
      if (seedPerLen > 0) seedPerLen * (maxPieceLen - 1) else seedMulti
    var counts: DataFrame = null
    for (r <- 1 to rounds) {
      keep = keep * 3 / 4
      counts = segmentCounts(w, vocab, maxPieceLen)
      if (r < rounds) {
        // mid-chain model to the driver: alphabet + keep entries
        val cm = counts.collect()
          .map(x => x.getString(0) -> x.getLong(1)).toMap
        vocab = chars.map { case (p, _) => (p, cm.getOrElse(p, 0L)) } ++
          cm.iterator.filter(_._1.length > 1).toSeq
            .sortBy { case (p, c) => (-c, p) }.take(keep)
      }
    }
    // final round's prune stays distributed: the gate output is a
    // frame, not a driver model
    val s = w.sparkSession
    import s.implicits._
    val charDf = chars.map(_._1).toSeq.toDF("piece")
    val finalChars = charDf.join(counts, Seq("piece"), "left")
      .select(col("piece"), coalesce(col("cnt"), lit(0L)).as("cnt"))
    val finalMulti = counts.filter(length(col("piece")) > 1)
      .orderBy(col("cnt").desc, col("piece").asc).limit(keep)
    finalChars.unionByName(finalMulti)
  }

  /** ENCODE with the trained vocab — t25's apply half for the unigram
    * model: train (driver-side KB model), then Viterbi-segment the
    * whole corpus with the final piece scores and count the merged
    * units (length >= 2 — single chars are by definition unmerged,
    * same reporting contract as the BPE encode gate). The encode pass
    * is the same row-local HOF dynamic program as training's E-step:
    * embarrassingly parallel, model broadcast as one map literal,
    * zero joins — the 100 TB corpus-encode shape. */
  def encodeCounts(docs: DataFrame, rounds: Int,
                   seedMulti: Int = 64,
                   maxPieceLen: Int = MaxPieceLen,
                   seedPerLen: Int = 0): DataFrame = {
    // ONE corpus scan: the checkpointed word frame feeds training AND
    // the encode pass (words-not-corpus on both sides)
    val w = words(docs).localCheckpoint()
    val vocab = trainOn(w, rounds, seedMulti, maxPieceLen, seedPerLen)
      .collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    segmentCounts(w, vocab, maxPieceLen)
      .filter(length(col("piece")) > 1)
      .select(col("piece"), col("cnt"))
  }

  /** Viterbi segmentation LENGTH per distinct word under `vocab` —
    * the piece count the fertility metric weights by corpus frequency.
    * Same row-local DP as [[segmentCounts]], reporting sizes instead
    * of exploding pieces (no shuffle at all: one map over the word
    * frame). */
  def segmentationLengths(w: DataFrame,
                          vocab: Seq[(String, Long)],
                          maxPieceLen: Int = MaxPieceLen): DataFrame = {
    require(vocab.forall(_._2 < Big / MaxWordLen),
      s"unigram piece count >= ${Big / MaxWordLen} would invert the " +
        "integer Viterbi objective — raise UnigramOps.Big for this corpus")
    w.withColumn("__vm", typedLit(vocab.toMap))
      .withColumn("__dp", expr(dpSqlFor(maxPieceLen)))
      .select(col("word"),
        size(expr(btSql)).cast("long").as("n_pieces"))
      .drop("__vm", "__dp")
  }

  // ---------------------------------------------------------------------
  // DuckDB replay
  // ---------------------------------------------------------------------

  // the cost reads join alias p$j (bound to the round's vocab CTE at
  // the LEFT JOIN in emStageSql) — no vocab name appears here
  private def cc(j: Int): String =
    s"""CASE WHEN p$j.piece IS NOT NULL
          THEN d.c[d.i - $j + 1] + ($Big - p$j.cnt)
          ELSE CAST($Huge AS BIGINT) END"""

  /** the full EM chain as one WITH RECURSIVE block: per round, a
    * recursive dp CTE (one level per character position, the same
    * LEAST/CASE arithmetic as [[dpSql]]), a recursive backtrack CTE,
    * the usage-count aggregate, and the prune — value-for-value the
    * Spark chain */
  def oracleSql(rounds: Int, seedMulti: Int = 64,
                table: String = "documents",
                maxPieceLen: Int = MaxPieceLen,
                seedPerLen: Int = 0): String = {
    val pool = initialPool(seedMulti, maxPieceLen, seedPerLen)
    val stages = (1 to rounds)
      .map(r => emStageSql(r, pruneTo(pool, r), maxPieceLen))
      .mkString(",", ",", "")
    s"${oracleHead(table, seedMulti, maxPieceLen, seedPerLen)}$stages\n" +
      s"      SELECT piece, CAST(cnt AS BIGINT) AS cnt FROM v$rounds"
  }

  /** ENCODE replay ([[encodeCounts]]'s oracle): the training chain
    * verbatim, then ONE more dp/backtrack/count pass against the final
    * vocab — no prune — reporting the merged units (length >= 2) */
  def encodeOracleSql(rounds: Int, seedMulti: Int = 64,
                      table: String = "documents",
                      maxPieceLen: Int = MaxPieceLen,
                      seedPerLen: Int = 0): String = {
    val pool = initialPool(seedMulti, maxPieceLen, seedPerLen)
    val stages = (1 to rounds)
      .map(r => emStageSql(r, pruneTo(pool, r), maxPieceLen))
    val enc = emStageSql(rounds + 1, keep = -1, maxPieceLen)
    s"""${oracleHead(table, seedMulti, maxPieceLen, seedPerLen)}${
      (stages :+ enc).mkString(",", ",", "")}
      SELECT piece, CAST(cnt AS BIGINT) AS cnt FROM cnt${rounds + 1}
      WHERE length(piece) > 1"""
  }

  /** FERTILITY replay: the training chain, one segmentation pass with
    * the final vocab (pieces-per-word from the backtrack row counts),
    * and a per-language rollup weighted by (lang, word) corpus
    * frequency — tokens-per-word and chars-per-token, the two numbers
    * a tokenizer evaluation reads per language. The DOUBLE columns are
    * single divisions of identical bigint sums on both engines
    * (IEEE-exact, the t01 discipline). */
  def fertilityOracleSql(rounds: Int, seedMulti: Int = 64,
                         table: String = "documents",
                         maxPieceLen: Int = MaxPieceLen,
                         seedPerLen: Int = 0): String = {
    val pool = initialPool(seedMulti, maxPieceLen, seedPerLen)
    val stages = (1 to rounds)
      .map(r => emStageSql(r, pruneTo(pool, r), maxPieceLen))
    val enc = emStageSql(rounds + 1, keep = -1, maxPieceLen)
    s"""${oracleHead(table, seedMulti, maxPieceLen, seedPerLen)}${
      (stages :+ enc).mkString(",", ",", "")},
      wl AS MATERIALIZED (
        SELECT lang, word, COUNT(*) AS freq
        FROM (SELECT lang,
                unnest(string_split_regex(lower(text), '[^a-z0-9]+'))
                  AS word FROM $table)
        WHERE LENGTH(word) BETWEEN 1 AND $MaxWordLen GROUP BY 1, 2),
      ppw AS (
        SELECT word, COUNT(*) AS n_pieces
        FROM bt${rounds + 1} WHERE pos > 0 GROUP BY 1)
      SELECT wl.lang,
        CAST(SUM(wl.freq) AS BIGINT) AS n_words,
        CAST(SUM(wl.freq * ppw.n_pieces) AS BIGINT) AS n_tokens,
        CAST(SUM(wl.freq * length(wl.word)) AS BIGINT) AS n_chars,
        CAST(CAST(SUM(wl.freq * ppw.n_pieces) AS BIGINT) AS DOUBLE)
          / CAST(CAST(SUM(wl.freq) AS BIGINT) AS DOUBLE) AS fertility,
        CAST(CAST(SUM(wl.freq * length(wl.word)) AS BIGINT) AS DOUBLE)
          / CAST(CAST(SUM(wl.freq * ppw.n_pieces) AS BIGINT) AS DOUBLE)
          AS chars_per_token
      FROM wl JOIN ppw ON wl.word = ppw.word
      GROUP BY 1"""
  }

  /** SAMPLED-ENCODE replay ([[sampledEncodeCounts]]'s oracle): the
    * training chain verbatim, one more dp pass against the final vocab
    * for the cost arrays, then the sampled choice per (word, position)
    * with the SAME md5 draw arithmetic, a list-assembled backtrack,
    * and the merged-unit count — every draw replays bit-for-bit
    * because cost, weights, and the uniform are all integers. */
  def sampleOracleSql(rounds: Int, slack: Long, salt: String,
      seedMulti: Int = 64, table: String = "documents",
      maxPieceLen: Int = MaxPieceLen, seedPerLen: Int = 0): String = {
    require(salt.matches("[A-Za-z0-9_]+"),
      s"salt must match [A-Za-z0-9_]+, got '$salt'")
    val L = maxPieceLen
    val pool = initialPool(seedMulti, maxPieceLen, seedPerLen)
    val stages = (1 to rounds).map(r => emStageSql(r, pruneTo(pool, r), L))
    // stage rounds+1 is included for its dp CTE only (the final-vocab
    // cost arrays); its bt/cnt CTEs go unreferenced and unevaluated
    val enc = emStageSql(rounds + 1, keep = -1, L)
    val R = rounds
    def w(j: Int) =
      s"""CASE WHEN q$j.piece IS NOT NULL
            AND f.c[t.pos - $j + 1] + ($Big - q$j.cnt)
              <= f.c[t.pos + 1] + $slack
          THEN q$j.cnt + 1 ELSE 0 END"""
    val joins = (1 to L).map(j =>
      s"""LEFT JOIN v$R q$j ON t.pos >= $j
            AND q$j.piece = substring(f.word, t.pos - $j + 1, $j)""")
      .mkString("\n          ")
    val cums = (1 to L)
      .map(k => (1 to k).map(i => s"w$i").mkString("(", " + ", ")"))
    val choice = (1 until L)
      .map(k => s"WHEN u < ${cums(k - 1)} THEN $k")
      .mkString("\n            ")
    s"""${oracleHead(table, seedMulti, L, seedPerLen)}${
      (stages :+ enc).mkString(",", ",", "")},
      sfin AS (SELECT word, freq, c FROM dp${R + 1}
               WHERE i = length(word) + 1),
      sw AS (
        SELECT f.word, f.freq, t.pos,
          ${(1 to L).map(j => s"${w(j)} AS w$j").mkString(",\n          ")}
        FROM sfin f
        CROSS JOIN LATERAL unnest(range(1, length(f.word) + 1)) t(pos)
          $joins),
      sch AS (
        SELECT word, freq, pos, CASE $choice ELSE $L END AS sj
        FROM (SELECT word, freq, pos,
                ${(1 to L).map(i => s"w$i").mkString(", ")},
                CAST(CONCAT('0x', substring(md5(word || ':' ||
                  CAST(pos AS VARCHAR) || ':$salt'), 1, 13)) AS BIGINT)
                  % ${cums.last} AS u
              FROM sw)),
      sarr AS MATERIALIZED (
        SELECT word, freq, list(sj ORDER BY pos) AS sj
        FROM sch GROUP BY word, freq),
      sbt AS (
        SELECT word, freq, CAST(length(word) AS BIGINT) AS pos, sj
        FROM sarr
        UNION ALL
        SELECT word, freq, pos - sj[pos], sj FROM sbt WHERE pos > 0),
      scnt AS (
        SELECT substring(word, pos - sj[pos] + 1, sj[pos]) AS piece,
               CAST(SUM(freq) AS BIGINT) AS cnt
        FROM sbt WHERE pos > 0 GROUP BY 1)
      SELECT piece, cnt FROM scnt WHERE length(piece) > 1"""
  }

  /** the multi-piece budget after `r` 3/4-shrink prunes (integer
    * arithmetic — both engines replay the same schedule) */
  private def pruneTo(pool: Int, r: Int): Int =
    (1 to r).foldLeft(pool)((k, _) => k * 3 / 4)

  /** the multi-piece pool the shrink schedule starts from — mirrors
    * [[trainOn]]'s `keep` initialization exactly */
  private def initialPool(seedMulti: Int, maxPieceLen: Int,
                          seedPerLen: Int): Int =
    if (seedPerLen > 0) seedPerLen * (maxPieceLen - 1) else seedMulti

  private def oracleHead(table: String, seedMulti: Int,
                         maxPieceLen: Int = MaxPieceLen,
                         seedPerLen: Int = 0): String = {
    // v0's multi-piece pool: global top-seedMulti, or (seedPerLen > 0)
    // the per-length pool — row_number per length partition is the
    // oracle twin of seedPoolPerLen's per-length TakeOrdereds
    val seed =
      if (seedPerLen > 0) s"""
        SELECT piece, cnt FROM (
          SELECT piece, cnt, row_number() OVER (
              PARTITION BY length(piece)
              ORDER BY cnt DESC, piece ASC) AS rn
          FROM ms) WHERE rn <= $seedPerLen"""
      else s"""
        SELECT piece, cnt FROM (SELECT piece, cnt FROM ms
                                ORDER BY cnt DESC, piece ASC
                                LIMIT $seedMulti)"""
    s"""
      WITH RECURSIVE w AS MATERIALIZED (
        SELECT word, COUNT(*) AS freq
        FROM (SELECT unnest(string_split_regex(lower(text), '[^a-z0-9]+'))
                AS word FROM $table)
        WHERE LENGTH(word) BETWEEN 1 AND $MaxWordLen GROUP BY 1),
      ch AS MATERIALIZED (
        SELECT substring(word, s, 1) AS piece,
               CAST(SUM(freq) AS BIGINT) AS cnt
        FROM w CROSS JOIN LATERAL unnest(range(1, length(word) + 1)) t(s)
        GROUP BY 1),
      ms AS (
        SELECT substring(word, s, l) AS piece,
               CAST(SUM(freq) AS BIGINT) AS cnt
        FROM w
        CROSS JOIN LATERAL unnest(range(2, ${maxPieceLen + 1})) tl(l)
        CROSS JOIN LATERAL unnest(range(1, length(word) - l + 2)) ts(s)
        GROUP BY 1),
      v0 AS MATERIALIZED (
        SELECT piece, cnt FROM ch
        UNION ALL$seed)"""
  }

  /** one EM stage (dp + backtrack + usage counts, and the prune when
    * `keep >= 0`) against the previous stage's vocab v(r-1) */
  private def emStageSql(r: Int, keep: Int,
                         maxPieceLen: Int = MaxPieceLen): String = {
    val costs = (1 to maxPieceLen).map(cc)
    val m = s"LEAST(${costs.mkString(",\n            ")})"
    val choice = (maxPieceLen to 2 by -1)
      .map(j => s"WHEN ${costs(j - 1)} = $m THEN ${j}").mkString("\n          ")
    val joins = (1 to maxPieceLen).map(j =>
      s"""LEFT JOIN v${r - 1} p$j ON d.i >= $j
            AND p$j.piece = substring(d.word, d.i - $j + 1, $j)""")
      .mkString("\n          ")
    val prune = if (keep < 0) "" else s""",
      v$r AS MATERIALIZED (
        SELECT ch.piece, CAST(COALESCE(c.cnt, 0) AS BIGINT) AS cnt
        FROM ch LEFT JOIN cnt$r c ON ch.piece = c.piece
        UNION ALL
        SELECT piece, cnt FROM (SELECT piece, cnt FROM cnt$r
                                WHERE length(piece) > 1
                                ORDER BY cnt DESC, piece ASC
                                LIMIT $keep))"""
    s"""
      dp$r AS (
        SELECT word, freq, CAST(1 AS BIGINT) AS i,
               [CAST(0 AS BIGINT)] AS c, [CAST(1 AS BIGINT)] AS j
        FROM w
        UNION ALL
        SELECT d.word, d.freq, d.i + 1,
          list_append(d.c, $m),
          list_append(d.j, CAST(CASE $choice ELSE 1 END AS BIGINT))
        FROM dp$r d
          $joins
        WHERE d.i <= length(d.word)),
      bt$r AS (
        SELECT word, freq, CAST(length(word) AS BIGINT) AS pos, j
        FROM dp$r WHERE i = length(word) + 1
        UNION ALL
        SELECT word, freq, pos - j[pos + 1], j
        FROM bt$r WHERE pos > 0),
      cnt$r AS MATERIALIZED (
        SELECT substring(word, pos - j[pos + 1] + 1, j[pos + 1]) AS piece,
               CAST(SUM(freq) AS BIGINT) AS cnt
        FROM bt$r WHERE pos > 0 GROUP BY 1)$prune"""
  }
}
