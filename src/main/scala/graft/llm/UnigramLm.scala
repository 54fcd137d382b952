package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Unigram-LM (SentencePiece-style) subword tokenization: build a
  * substring vocabulary with corpus frequencies, then segment every
  * word by VITERBI — the maximum-likelihood split under the unigram
  * piece model (Kudo 2018's inference step, with frequency-estimated
  * piece probabilities standing in for the EM loop). Complements the
  * BPE family ([[Bpe]]): BPE segments by merge rank, unigram-LM by
  * global likelihood — the two production tokenizer families.
  *
  * Scale shape: vocabulary building is one explode + one piece-grain
  * aggregate over DISTINCT WORD FORMS (weighted by occurrence counts
  * — the corpus text is never re-scanned per piece length); the DP
  * runs once per distinct form (the [[Bpe.tokenizeDocWords]] key-grain
  * discipline), map-only after one piece-grain equi-join; documents
  * get their stats by one word-grain join. Nothing quadratic, nothing
  * driver-side.
  *
  * Exactness: piece log-probs are rounded ONCE to nano-units at vocab
  * grain; the DP state is a single packed BIGINT per position —
  * `pk = score_nano·512 + (63 − n_pieces)·8 + last_piece_len` — so
  * "maximize likelihood, tie → fewest pieces, tie → longest final
  * piece" is ONE integer comparison identical in Spark and the
  * recursive-CTE twin. Packing bounds (documented contract): words
  * longer than [[MaxWordLen]] chars are excluded from both vocabulary
  * and scoring, so n_pieces fits its 6-bit field and
  * |score_nano·512| stays far below 2^53 — the extraction divisions
  * are exact in double on both engines.
  */
object UnigramLm {

  /** Longest candidate piece, chars. */
  val MaxPieceLen = 4
  /** Words longer than this are excluded (packing + cost bound). */
  val MaxWordLen = 32
  /** Pieces below this corpus count are dropped — except single chars,
    * which are always kept so every word stays segmentable.
    */
  val MinCount = 3
  /** Packed DP sentinel for position 0: score 0, 0 pieces, len 0. */
  val Sentinel = 504L

  /** Word occurrences `(idCol, word)` within the length contract. */
  def wordOccurrences(docs: DataFrame, idCol: String,
                      textCol: String): DataFrame =
    docs.select(col(idCol),
        explode(TextStats.tokens(col(textCol))).as("word"))
      .where(length(col("word")).between(1, MaxWordLen))

  /** Distinct word forms with occurrence counts. */
  def wordForms(wordOcc: DataFrame): DataFrame =
    wordOcc.groupBy(col("word")).agg(count(lit(1)).as("n_occ"))

  /** Substring piece counts over the corpus (each in-word position of
    * each piece counts once per word occurrence), at piece grain.
    */
  def pieceCounts(forms: DataFrame): DataFrame =
    forms.select(col("n_occ"), expr(
        s"""explode(flatten(transform(sequence(1, length(word)), i ->
           |  transform(sequence(1, least($MaxPieceLen, i)), j ->
           |    substring(word, i - j + 1, j))))) AS piece""".stripMargin))
      .groupBy(col("piece")).agg(sum(col("n_occ")).as("cnt"))

  /** The vocabulary: pieces with `cnt >= MinCount` plus ALL single
    * chars, `lp_nano = round(ln(cnt/total)·1e9)` normalized over the
    * kept set.
    */
  def vocab(counts: DataFrame): DataFrame = {
    val kept = counts
      .where(col("cnt") >= MinCount || length(col("piece")) === 1)
    val tot = kept.agg(sum(col("cnt")).as("__t"))
    kept.join(broadcast(tot))
      .select(col("piece"),
        round(log(col("cnt").cast("double") / col("__t").cast("double")) *
          lit(1e9)).cast("long").as("lp_nano"))
  }

  // the packed-key DP, as a SQL expression over (word, m) where m maps
  // candidate key i·8+j -> lp_nano. See the object scaladoc for the
  // packing; CASE guards keep element_at indices valid and greatest()
  // skips null candidates on both engines.
  private def candSql(k: Int): String = {
    val prev = s"element_at(acc, i - $k + 1)"
    val lp = s"element_at(m, i * 8 + $k)"
    s"""case when i >= $k and $lp is not null then
       |  (cast((($prev) - pmod($prev, 512L)) / 512 as bigint) + $lp) * 512
       |  + (cast((pmod($prev, 512L) - pmod(pmod($prev, 512L), 8L)) / 8 as bigint) - 1) * 8 + $k
       |end""".stripMargin
  }

  private val DpSql: String =
    s"""aggregate(sequence(1, length(word)), array(cast($Sentinel as bigint)),
       |  (acc, i) -> concat(acc, array(greatest(
       |    ${(1 to MaxPieceLen).map(candSql).mkString(",\n    ")}))),
       |  acc -> element_at(acc, size(acc)))""".stripMargin

  /** `forms` decorated with the candidate lp map `m` (key i·8+j →
    * lp_nano) under `vocabDf` — the shared setup of the scoring and
    * piece-emitting DPs.
    */
  private def withCandMap(forms: DataFrame, vocabDf: DataFrame): DataFrame =
    withCandMapFrom(forms, candEntries(forms), vocabDf)

  /** Every candidate `(word, k = i·8+j, piece)` of every form — the
    * ROUND-INVARIANT half of the DP setup (r12: the EM loop used to
    * re-explode this per round; only the vocabulary changes).
    */
  private def candEntries(forms: DataFrame): DataFrame =
    forms.select(col("word"), expr(
        s"""explode(flatten(transform(sequence(1, length(word)), i ->
           |  transform(sequence(1, least($MaxPieceLen, i)), j ->
           |    struct(i * 8 + j AS k,
           |           substring(word, i - j + 1, j) AS piece))))) AS c"""
          .stripMargin))
      .select(col("word"), col("c.k").as("k"), col("c.piece").as("piece"))

  private def withCandMapFrom(forms: DataFrame, cand: DataFrame,
                              vocabDf: DataFrame): DataFrame = {
    val m = cand
      .join(vocabDf, Seq("piece")) // absent pieces = no candidate
      .groupBy(col("word"))
      .agg(map_from_entries(collect_list(struct(col("k"), col("lp_nano"))))
        .as("m"))
    forms.join(m, Seq("word")) // total: single chars are always kept
  }

  /** Viterbi-segment every distinct form: `(word, n_occ, n_pieces,
    * score_nano)` — the likelihood-optimal segmentation's piece count
    * and exact score.
    */
  def segmentForms(forms: DataFrame, vocabDf: DataFrame): DataFrame =
    withCandMap(forms, vocabDf)
      .withColumn("__pk", expr(DpSql))
      .select(col("word"), col("n_occ"),
        (lit(63L) - ((pmod(col("__pk"), lit(512L)) -
          pmod(pmod(col("__pk"), lit(512L)), lit(8L))) / lit(8))
          .cast("long")).as("n_pieces"),
        ((col("__pk") - pmod(col("__pk"), lit(512L))) / lit(512))
          .cast("long").as("score_nano"))

  // [[DpSql]] with an identity finish: the FULL packed array (position
  // p at index p+1), so the optimal path is recoverable — each packed
  // value's low 3 bits are the best candidate's piece length at that
  // position, which is exactly a Viterbi backpointer.
  private val DpAllSql: String =
    s"""aggregate(sequence(1, length(word)), array(cast($Sentinel as bigint)),
       |  (acc, i) -> concat(acc, array(greatest(
       |    ${(1 to MaxPieceLen).map(candSql).mkString(",\n    ")}))),
       |  acc -> acc)""".stripMargin

  // walk the backpointers from position length(word) down to 0, at
  // most MaxWordLen hops, emitting each step's piece: j = pmod(pk, 8)
  // (8 divides 512, so the low 3 bits survive the score field) and the
  // predecessor is pos - j. Words are non-empty and single chars are
  // always in vocab, so every position has j >= 1 — the walk always
  // reaches 0.
  private val BacktrackSql: String =
    s"""aggregate(sequence(1, $MaxWordLen),
       |  struct(cast(length(word) as int) as pos,
       |         cast(array() as array<string>) as ps),
       |  (st, x) -> case when st.pos <= 0 then st else named_struct(
       |    'pos', cast(st.pos - pmod(element_at(__acc, st.pos + 1), 8) as int),
       |    'ps', array_append(st.ps, substring(word,
       |      cast(st.pos - pmod(element_at(__acc, st.pos + 1), 8) + 1 as int),
       |      cast(pmod(element_at(__acc, st.pos + 1), 8) as int)))) end,
       |  st -> st.ps)""".stripMargin

  /** The pieces ON each form's Viterbi path (exploded, multiplicity
    * preserved): `(word, n_occ, piece)` — the hard-EM E-step readout.
    */
  def viterbiPieces(forms: DataFrame, vocabDf: DataFrame): DataFrame =
    withCandMap(forms, vocabDf)
      .withColumn("__acc", expr(DpAllSql))
      .select(col("word"), col("n_occ"),
        explode(expr(BacktrackSql)).as("piece"))

  /** The seed vocabulary WITH its corpus counts: `(piece, cnt,
    * lp_nano)` — [[vocab]]'s kept set, counts retained for the
    * trainer's prune ranking.
    */
  def vocabWithCounts(counts: DataFrame): DataFrame = {
    val kept = counts
      .where(col("cnt") >= MinCount || length(col("piece")) === 1)
    val tot = kept.agg(sum(col("cnt")).as("__t"))
    kept.join(broadcast(tot))
      .select(col("piece"), col("cnt"),
        round(log(col("cnt").cast("double") / col("__t").cast("double")) *
          lit(1e9)).cast("long").as("lp_nano"))
  }

  /** SentencePiece-style unigram TRAINING (Kudo '18 §3.2's loop in its
    * deterministic hard-EM form): seed vocabulary from substring
    * counts, then `rounds` iterations of
    *
    *  1. '''E-step''' — Viterbi-segment every distinct word form under
    *     the current model ([[viterbiPieces]]; the same packed-BIGINT
    *     DP the inference path certifies) and count each piece's
    *     occurrences on the optimal paths, occurrence-weighted;
    *  2. '''prune''' — single-char pieces are always kept (coverage —
    *     SentencePiece's required-char rule); multi-char pieces must
    *     have been USED this round, and only the top
    *     `ceil(3/4 · |used multi|)` by (usage desc, piece asc) survive
    *     — the shrinking-factor step, with usage standing in for the
    *     likelihood-loss ranking;
    *  3. '''M-step''' — re-estimate `lp_nano = round(ln(cnt/total)·1e9)`
    *     over the kept set, unused singles floored at count 1 (they
    *     must keep a finite probability to guarantee segmentability).
    *
    * Hard EM (Viterbi counts) rather than SentencePiece's
    * forward-backward expectations is the deliberate contract choice:
    * expected counts need log-sum-exp over path space, which no integer
    * grid makes bit-reproducible across engines, while the Viterbi path
    * is already a certified exact-integer object — so training inherits
    * the inference DP's cross-engine determinism. Fixed `rounds` is the
    * contract (no convergence test), mirroring the BPE family's fixed
    * merge count.
    *
    * Scale shape: each round is one form-grain DP (map-only after the
    * piece-grain candidate join), one piece-grain count, one
    * vocab-grain prune. The prune's global window orders VOCAB-grain
    * rows (bounded by the ≤[[MaxPieceLen]]-gram space, not the corpus);
    * every crossJoin broadcasts a 1-row aggregate. Per-round
    * `localCheckpoint` cuts the lineage so round r+1's plan does not
    * nest round r's DP.
    *
    * @return `(piece, cnt, lp_nano)` — the trained vocabulary;
    *         `select(piece, lp_nano)` feeds [[segmentForms]] /
    *         [[exportVocab]] directly.
    */
  def trainVocab(forms: DataFrame, rounds: Int = 2): DataFrame = {
    require(rounds >= 1, s"rounds=$rounds")
    val (f, cand, seed) = trainSetup(forms)
    var v = seed
    (1 to rounds).foreach { _ =>
      val prev = v
      v = emRound(f, cand, v, expr("(__n * 3 + 3) div 4"))
      // the superseded vocab generation has no reader once the next
      // round's checkpoint materializes (rounds >= 1, so `seed` is
      // always superseded and the returned frame never released)
      org.apache.spark.sql.graftbridge.CheckpointBridge.release(prev)
    }
    org.apache.spark.sql.graftbridge.CheckpointBridge.release(cand)
    org.apache.spark.sql.graftbridge.CheckpointBridge.release(f)
    v
  }

  /** Shared E-step setup (r12): the distinct-form table and the
    * candidate entries are ROUND-INVARIANT, so the loop reads them as
    * materialized blocks instead of re-running the corpus tokenize +
    * form aggregate + candidate explode every round. Candidates are
    * semi-filtered by the SEED vocabulary — pruning only ever shrinks
    * the kept set, so a candidate absent from the seed can never join a
    * later round's model.
    */
  private def trainSetup(
      forms: DataFrame): (DataFrame, DataFrame, DataFrame) = {
    val f = forms.localCheckpoint(true)
    val seed = vocabWithCounts(pieceCounts(f)).localCheckpoint(true)
    val cand = candEntries(f)
      .join(seed.select(col("piece")), Seq("piece"), "left_semi")
      .localCheckpoint(true)
    (f, cand, seed)
  }

  /** One hard-EM round shared by the fixed-round and target-size
    * trainers: Viterbi E-step usage under `v`, prune used multi-char
    * pieces to rank ≤ `cap` (an expression over `__n` = the used-multi
    * count, broadcast as a 1-row aggregate), singles always kept with
    * usage floored at 1, M-step nano-grid re-estimation. Checkpointed
    * so the next round's plan does not nest this round's DP.
    */
  private def emRound(forms: DataFrame, cand: DataFrame, v: DataFrame,
                      cap: Column): DataFrame = {
    val use = withCandMapFrom(forms, cand,
        v.select(col("piece"), col("lp_nano")))
      .withColumn("__acc", expr(DpAllSql))
      .select(col("word"), col("n_occ"),
        explode(expr(BacktrackSql)).as("piece"))
      .groupBy(col("piece")).agg(sum(col("n_occ")).as("__u"))
    val scored = v.select(col("piece"))
      .join(use, Seq("piece"), "left")
      .select(col("piece"), coalesce(col("__u"), lit(0L)).as("__u"))
    val singles = scored.where(length(col("piece")) === 1)
      .select(col("piece"), greatest(col("__u"), lit(1L)).as("cnt"))
    val multi = scored
      .where(length(col("piece")) > 1 && col("__u") >= 1L)
    val nMulti = multi.agg(count(lit(1)).as("__n"))
    val keptMulti = multi
      .withColumn("__rk", row_number().over(
        Window.orderBy(col("__u").desc, col("piece"))))
      .crossJoin(broadcast(nMulti))
      .where(col("__rk") <= cap)
      .select(col("piece"), col("__u").as("cnt"))
    val kept = singles.union(keptMulti)
    val tot = kept.agg(sum(col("cnt")).as("__t"))
    kept.join(broadcast(tot))
      .select(col("piece"), col("cnt"),
        round(log(col("cnt").cast("double") / col("__t").cast("double")) *
          lit(1e9)).cast("long").as("lp_nano"))
      .localCheckpoint(true)
  }

  /** [[trainVocab]] under SentencePiece's ACTUAL stopping rule: prune
    * until at most `targetMulti` multi-char pieces remain, the round
    * count DERIVED from the data rather than fixed. Each round's cap is
    * `max(targetMulti, ⌊3/4 · |used multi|⌋)` — the shrinking-factor
    * step floored at the target (SentencePiece keeps
    * `int(0.75 · |V|)` per prune, never cutting below the requested
    * vocab size), so the loop terminates in ≤ log₄⒡₃(|multi₀|) rounds:
    * while above target the kept count is strictly below the current
    * count (⌊3n/4⌋ < n for all n ≥ 1), and once ⌊3n/4⌋ ≤ targetMulti
    * the cap IS the target, so the next round lands ≤ target exactly.
    * The 64-round require is an invariant guard, not a contract knob —
    * it allows a 2.4e8× starting-to-target ratio.
    *
    * Driver-side state is two BIGINTs per round (the vocab-grain count
    * and the round index); everything data-grain stays distributed,
    * same as [[trainVocab]]. Returns the trained vocabulary AND the
    * derived round count — the count is part of the certified model
    * contract (the oracle twin unrolls exactly that many rounds and
    * independently asserts both sides of the stopping rule).
    */
  def trainVocabToSize(forms: DataFrame,
                       targetMulti: Int): (DataFrame, Int) = {
    require(targetMulti >= 1, s"targetMulti=$targetMulti")
    val (f, cand, seed) = trainSetup(forms)
    var v = seed
    def nMulti: Long = v.where(length(col("piece")) > 1).count()
    var rounds = 0
    while (nMulti > targetMulti) {
      rounds += 1
      require(rounds <= 64,
        s"target-vocab loop failed to converge to $targetMulti in 64 rounds")
      val prev = v
      v = emRound(f, cand, v,
        greatest(lit(targetMulti.toLong), expr("(__n * 3) div 4")))
      // superseded generation; `seed` may BE the result when the seed
      // vocabulary is already at target (loop body never runs), which
      // is why the release lives inside the loop
      org.apache.spark.sql.graftbridge.CheckpointBridge.release(prev)
    }
    org.apache.spark.sql.graftbridge.CheckpointBridge.release(cand)
    org.apache.spark.sql.graftbridge.CheckpointBridge.release(f)
    (v, rounds)
  }

  /** Write the vocabulary in the SentencePiece-style `.vocab` text
    * shape — one `piece<TAB>lp_nano` line per piece — as a DISTRIBUTED
    * text write (a unigram vocabulary is data-grain at corpus scale;
    * a driver collect here would be the wrong bound). lp_nano is the
    * exact integer, so the artifact round-trips bit-for-bit. Pieces
    * are substrings of whitespace-split tokens, so they can contain
    * neither tab nor newline — the format needs no escaping.
    */
  def exportVocab(vocabDf: DataFrame, path: String): Unit =
    vocabDf.select(concat_ws("\t", col("piece"),
        col("lp_nano").cast("string")))
      .write.mode("overwrite").text(path)

  /** Read a vocabulary written by [[exportVocab]] back into the
    * `(piece, lp_nano)` shape [[segmentForms]] consumes.
    */
  def importVocab(spark: org.apache.spark.sql.SparkSession,
                  path: String): DataFrame =
    spark.read.text(path)
      .select(
        substring_index(col("value"), "\t", 1).as("piece"),
        substring_index(col("value"), "\t", -1).cast("long").as("lp_nano"))

  /** Per-document tokenization stats: `(idCol, n_words, n_pieces,
    * lp_nano_sum)` — exact BIGINTs; documents with no in-contract
    * words keep a zero row.
    */
  def docStats(docs: DataFrame, idCol: String,
               textCol: String): DataFrame =
    docStatsWith(docs, idCol, textCol, forms => vocab(pieceCounts(forms)))

  /** [[docStats]] under a caller-supplied vocabulary (e.g. a
    * [[trainVocab]] result or an [[importVocab]] round trip) — the
    * vocab factory sees the corpus word forms so the default seed path
    * stays a one-liner.
    */
  def docStatsWith(docs: DataFrame, idCol: String, textCol: String,
                   vocabFor: DataFrame => DataFrame): DataFrame = {
    val occ = wordOccurrences(docs, idCol, textCol).localCheckpoint(true)
    val forms = wordForms(occ)
    val seg = segmentForms(forms, vocabFor(forms))
    val per = occ.join(seg.select(col("word"), col("n_pieces"),
        col("score_nano")), Seq("word"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_words"),
        sum(col("n_pieces")).as("n_pieces"),
        sum(col("score_nano")).as("lp_nano_sum"))
    docs.select(col(idCol)).join(per, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_words"), lit(0L)).as("n_words"),
        coalesce(col("n_pieces"), lit(0L)).as("n_pieces"),
        coalesce(col("lp_nano_sum"), lit(0L)).as("lp_nano_sum"))
  }
}
