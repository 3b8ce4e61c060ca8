package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.Tables._
import graft.functions.HashFunctions._

/** Training-mix sampling operators (SURVEY.md §2 "LLM-pipeline") — the two
  * selection primitives a pretraining data pipeline runs after filtering:
  * per-source rate sampling (to hit a target mixture) and per-source token
  * budgeting (to cap each source's contribution). Both are deterministic
  * (hash-based / fixed order), so a re-run selects the identical corpus —
  * the property that makes a 100 TB ingestion job restartable and its
  * output citable.
  */
object Sampling {

  /** Per-stratum sampling rates (per-10000, integral so both engines
    * compare exactly): source k → rate bps. The training-mix knob.
    */
  val MixRates: Map[Int, Int] = Map(0 -> 10000, 1 -> 5000, 2 -> 2500, 3 -> 1000)

  /** Weighted stratified sampling: doc_id-hash coin per row against its
    * stratum's rate. Pure map-side filter — no shuffle, no RNG state; the
    * md5-derived coin is independent of partitioning and engine. The
    * stratum here is doc_id%4 standing in for a source/domain tag.
    */
  def mixture(s: SparkSession, d: String): DataFrame = {
    val doc = documents(s, d)
    val source = (col("doc_id") % 4).cast("int")
    val coin = md5Long(concat(lit("mix:"), col("doc_id"))) % 10000L
    val rate = MixRates.foldLeft(lit(0): org.apache.spark.sql.Column) {
      case (acc, (k, v)) => when(source === k, lit(v)).otherwise(acc)
    }
    doc.select(col("doc_id"), source.as("source"), coin.as("coin"))
      .filter(col("coin") < rate)
      .orderBy("doc_id")
  }

  /** Data-constrained mixture planning (Muennighoff et al. 2023: repeating
    * data beyond ~4 epochs stops helping): from the per-source token
    * inventory, derive a temperature-balanced target mixture (weight ∝
    * √inventory — the τ=2 softening [[temperature]] applies to langs),
    * each source's target tokens under a global budget, the epoch count
    * the target implies, the [[MaxEpochs]] cap, and the resulting
    * effective tokens + unmet deficit. This is the planning step that
    * turns "what do we have" into "what do we train on".
    *
    * Scale shape: one source-keyed aggregate over the corpus (map-side
    * partial), then all arithmetic on a catalog-sized relation with a
    * 1-row broadcast total — the plan costs one scan at any corpus size.
    * Floats: √inventory is 6-dp-floored before the DECIMAL sum, every
    * derived ratio 4-dp-floored, so engine-side fold order cannot move
    * the plan.
    */
  val EpochBudget = 400000L
  val MaxEpochs = 4.0

  def epochPlan(s: SparkSession, d: String): DataFrame = {
    import graft.core.Determinism._
    val doc = documents(s, d).select(col("source"),
      size(tokens(col("text"))).cast("long").as("n_tokens"))
    val per = doc.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("avail_tokens"))
    val rootW = r6(sqrt(col("avail_tokens").cast("double")))
    val tot = per.agg(dsum(rootW).as("wsum"))
    per.crossJoin(broadcast(tot))
      .select(col("source"), col("n_docs"), col("avail_tokens"),
        r6(rootW / col("wsum")).as("weight"))
      .withColumn("target_tokens", r4(col("weight") * EpochBudget))
      .withColumn("epochs",
        // greatest(avail,1): an all-empty source (avail_tokens=0) must
        // divide identically in both engines — guarded the same way in
        // the oracle SQL below
        r4(least(lit(MaxEpochs),
          col("target_tokens") /
            greatest(col("avail_tokens"), lit(1L)).cast("double"))))
      .withColumn("effective_tokens",
        r4(least(col("target_tokens"),
          col("avail_tokens").cast("double") * MaxEpochs)))
      .withColumn("deficit_tokens",
        r4(col("target_tokens") - col("effective_tokens")))
      .orderBy("source")
  }

  /** Dedup-AWARE source budgeting — [[epochPlan]] recomputed over the
    * EFFECTIVE (soft-dedup-discounted) token inventory instead of the raw
    * one: each doc contributes weight × n_tokens where weight =
    * 1/cluster_size from the resolved near-dup components
    * (dedup_soft_weight, read from the CACHED cluster labels). A source
    * whose volume is mostly internal duplication gets the √-target its
    * UNIQUE content earns, not its raw byte count — the planning step
    * that makes "down-weight, don't drop" actually reach the mixture.
    * Scale shape: one corpus-keyed join of ids-only weights to token
    * counts, one source-keyed partial agg, one 1-row broadcast — the
    * corpus text is read once for token counting and never paired.
    */
  def dedupBudget(s: SparkSession, d: String): DataFrame = {
    import graft.core.Determinism._
    val w = Dedup.softWeight(s, d).select(col("doc_id"), col("weight"))
    val toks = Dedup.corpus(s, d).select(col("doc_id"),
      (col("doc_id") % Dedup.ExactOffset).as("orig_id"),
      size(tokens(col("text"))).cast("long").as("n_tokens"))
    val src = documents(s, d).select(col("doc_id").as("orig_id"), col("source"))
    val per = toks.join(w, "doc_id").join(src, "orig_id")
      .groupBy(col("source"))
      .agg(sum(col("n_tokens")).as("raw_tokens"),
        dsum(r4(col("weight") * col("n_tokens"))).as("eff0"))
      .select(col("source"), col("raw_tokens"), r4(col("eff0")).as("eff_tokens"))
    val rootW = r6(sqrt(col("eff_tokens")))
    val tot = per.agg(dsum(rootW).as("wsum"))
    per.crossJoin(broadcast(tot))
      .select(col("source"), col("raw_tokens"), col("eff_tokens"),
        r4(col("eff_tokens") / col("raw_tokens").cast("double")).as("dedup_ratio"),
        r6(rootW / col("wsum")).as("weight"),
        r4(r6(rootW / col("wsum")) * EpochBudget).as("target_tokens"))
      .orderBy("source")
  }

  /** Per-source token budgeting: in deterministic doc_id order, keep each
    * source's docs while the running token total stays within the budget
    * (the doc that crosses the line is kept — budgets are soft caps). One
    * window per source partition: a single shuffle by source, cumulative
    * sum inside, no driver-side iteration.
    */
  val TokenBudget = 20000L

  def tokenBudget(s: SparkSession, d: String): DataFrame = {
    val doc = documents(s, d)
      .select(col("doc_id"), (col("doc_id") % 4).cast("int").as("source"),
        size(tokens(col("text"))).cast("long").as("n_tokens"))
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    doc.withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .filter(col("cum_tokens") - col("n_tokens") < TokenBudget)
      .select(col("source"), col("doc_id"), col("n_tokens"), col("cum_tokens"))
      .orderBy("source", "doc_id")
  }

  /** Sequence packing: documents are concatenated in deterministic order
    * and split into fixed SeqLen-token training sequences — each doc gets
    * the (seq_id, offset) where its tokens land. Packing is per shard
    * (doc_id hash), the way a real fleet packs: a GLOBAL order would be one
    * window partition = one task at 100 TB, while per-shard packing is an
    * embarrassingly parallel window per shard with one shuffle on the shard
    * key. offset = running token sum before the doc; a doc crossing a
    * SeqLen boundary spans sequences (reported via n_seqs).
    */
  val SeqLen = 2048L
  val PackShards = 8

  def pack(s: SparkSession, d: String): DataFrame = {
    val doc = documents(s, d).select(col("doc_id"),
      (col("doc_id") % PackShards).cast("int").as("shard"),
      size(tokens(col("text"))).cast("long").as("n_tokens"))
    val w = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    doc.withColumn("off", sum(col("n_tokens")).over(w) - col("n_tokens"))
      .select(col("shard"), col("doc_id"), col("n_tokens"),
        expr(s"off div $SeqLen").as("seq_id"),
        (col("off") % SeqLen).as("offset_in_seq"),
        // sequences this doc touches: boundary crossings + 1 (empty docs
        // occupy zero tokens but are attributed to the sequence at offset)
        (expr(s"(off + greatest(n_tokens, CAST(1 AS BIGINT)) - 1) div $SeqLen")
          - expr(s"off div $SeqLen") + 1L).as("n_seqs"))
      .orderBy("shard", "doc_id")
  }

  /** Temperature-scaled mixture (the pretraining-mix reweighting knob):
    * source i's effective weight is n_i^α (α = 0.5), i.e. rare sources are
    * upsampled RELATIVE to abundant ones. The per-source keep rate is
    * r_i = n_i^(α-1) scaled so the rarest source keeps 100%:
    * rate_i = sqrt(n_min/n_i). Selection is the deterministic md5 coin
    * against floor(10000·rate).
    *
    * Engine-parity note: α is 0.5 ON PURPOSE — IEEE-754 specifies sqrt
    * exactly (correctly rounded), unlike pow, so both engines compute
    * bit-identical rates and the floor can never straddle an ulp.
    */
  def temperature(s: SparkSession, d: String): DataFrame = {
    val doc = documents(s, d)
      .select(col("doc_id"), (col("doc_id") % 4).cast("int").as("source"))
    val counts = doc.groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
      .withColumn("r", sqrt(col("n_docs").cast("double")) / col("n_docs").cast("double"))
    // rmax belongs to the smallest source → it samples at 10000 bps exactly
    val norm = counts.agg(max(col("r")).as("rmax"))
    val rates = counts.crossJoin(broadcast(norm))
      .withColumn("rate_bps",
        floor(col("r") / col("rmax") * 10000.0).cast("long"))
    val sel = doc.join(broadcast(rates.select(col("source"), col("rate_bps"))), "source")
      .filter(md5Long(concat(lit("temp:"), col("doc_id"))) % 10000L < col("rate_bps"))
      .groupBy(col("source")).agg(count(lit(1)).as("n_sel"))
    rates.join(sel, Seq("source"), "left")
      .select(col("source"), col("n_docs"), col("rate_bps"),
        coalesce(col("n_sel"), lit(0L)).as("n_sel"))
      .orderBy("source")
  }

  /** Round-robin source interleaving — the training-order pass after
    * selection: assign every doc a global order index such that
    * consecutive training rows rotate across sources (no long same-source
    * runs, the property batch-construction wants). order = (rank-1)·S +
    * source, with rank a per-source window: one shuffle on the source key,
    * and the index is deterministic and dense per source.
    */
  def interleave(s: SparkSession, d: String): DataFrame = {
    val doc = documents(s, d)
      .select(col("doc_id"), (col("doc_id") % 4).cast("int").as("source"))
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
    doc.withColumn("rk", row_number().over(w))
      .select(col("doc_id"), col("source"),
        ((col("rk") - 1).cast("long") * 4 + col("source")).as("order_index"))
      .orderBy("order_index")
  }

  // ---- DSIR-style importance scoring ---------------------------------------
  /** Hashed-feature bucket count for the importance model — constant
    * regardless of corpus size, so the per-bucket weight table is always a
    * tiny broadcast.
    */
  val DsirBuckets = 4096L

  /** Data Selection via Importance Resampling (Xie et al. 2023) scoring:
    * rank raw documents by how target-like they are under two hashed-unigram
    * language models. Target = the `lang = 'en'` stratum; raw = the whole
    * corpus. Each token hashes into one of [[DsirBuckets]] buckets; a
    * bucket's weight is log2(p_target / p_raw) with Laplace smoothing, and a
    * doc's score is its mean token weight — positive means
    * more-target-like-than-average.
    *
    * Determinism: counts are exact integers; the single log2 per BUCKET
    * (never per token) is 6-dp-floored before the per-doc DECIMAL sum — the
    * [[graft.core.Determinism]] recipe that keeps libm out of the
    * accumulation. Scale shape: token hashing is map-side; the two count
    * aggregations shuffle only (bucket) keys into a 4096-row table that
    * broadcasts back onto the token stream; the final per-doc sum shuffles
    * (doc_id, weight) — the corpus text never moves twice.
    */
  def dsir(s: SparkSession, d: String): DataFrame = {
    import graft.core.Determinism
    val doc = documents(s, d)
    val toks = doc.select(col("doc_id"), col("lang"),
        explode(tokens(col("text"))).as("tok"))
      .filter(col("tok") =!= "")
      .select(col("doc_id"), col("lang"),
        (md5Long(concat(lit("dsir:"), col("tok"))) % DsirBuckets).as("b"))
      .localCheckpoint() // two consumers: bucket counts + per-doc scoring
    val counts = toks.groupBy(col("b")).agg(
      count(lit(1)).as("cr"),
      sum(when(col("lang") === "en", 1L).otherwise(0L)).as("ct"))
    val totals = counts.agg(sum(col("cr")).as("nr"), sum(col("ct")).as("nt"))
    val weights = counts.crossJoin(broadcast(totals))
      .select(col("b"), Determinism.r6(
        log2(((col("ct") + 1L).cast("double") * (col("nr") + DsirBuckets).cast("double"))
          / ((col("cr") + 1L).cast("double") * (col("nt") + DsirBuckets).cast("double"))))
        .as("w"))
    toks.join(broadcast(weights), "b")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"), Determinism.dsum(col("w")).as("wsum"))
      .select(col("doc_id"), col("n_tokens"),
        Determinism.r4(col("wsum") / col("n_tokens")).as("score_per_token"))
      .orderBy("doc_id")
  }

  /** Deterministic train/val/test holdout: the md5 coin buckets every doc
    * into 80/10/10 splits that are stable under corpus growth — a doc keeps
    * its split when new data arrives (the property row_number()-based
    * splits lack), which is what keeps eval sets uncontaminated across
    * refreshes. Pure map-side classification.
    */
  def holdout(s: SparkSession, d: String): DataFrame = {
    val coin = md5Long(concat(lit("split:"), col("doc_id"))) % 100L
    documents(s, d).select(col("doc_id"),
        when(coin < 80, "train").when(coin < 90, "val").otherwise("test")
          .as("split"))
      .orderBy("doc_id")
  }

  /** Class balancing: downsample every language stratum to the size of the
    * rarest one — the classifier-training prep that stops the majority
    * class from dominating. Selection within a stratum is by salted-hash
    * rank (deterministic, corpus-order-independent — row_number over an
    * arrival order would reshuffle on every repartition); the per-stratum
    * minimum is a 1-row broadcast. One window per stratum, one shuffle.
    */
  def balanced(s: SparkSession, d: String): DataFrame = {
    val doc = documents(s, d).select(col("doc_id"), col("lang"))
    val minN = doc.groupBy(col("lang")).agg(count(lit(1)).as("n"))
      .agg(min(col("n")).as("min_n"))
    val w = Window.partitionBy(col("lang"))
      .orderBy(md5Long(concat(lit("bal:"), col("doc_id"))), col("doc_id"))
    doc.withColumn("rk", row_number().over(w))
      .crossJoin(broadcast(minN))
      .filter(col("rk") <= col("min_n"))
      .select(col("doc_id"), col("lang"))
      .orderBy("doc_id")
  }

  /** Proportional allocation rate for [[stratified]], percent. */
  val StratPct = 10

  /** Exact proportional stratified sampling: every language stratum
    * contributes EXACTLY max(1, ⌊n·[[StratPct]]%⌋) rows — unlike the
    * per-row coin of [[mixture]], whose per-stratum counts are only
    * binomially close to the target. Selection within a stratum is salted-
    * hash rank (deterministic, corpus-order-independent), so the sample is
    * stable across runs, engines and repartitions; the per-stratum targets
    * are a strata-sized broadcast. One window per stratum = one shuffle by
    * lang; the guaranteed-floor property (every stratum represented) is
    * what evaluation-set builders need that rate sampling can't give.
    */
  def stratified(s: SparkSession, d: String): DataFrame = {
    val doc = documents(s, d).select(col("doc_id"), col("lang"))
    val targets = doc.groupBy(col("lang")).agg(count(lit(1)).as("n"))
      .select(col("lang"),
        greatest(lit(1L), expr(s"n * $StratPct div 100")).as("target"))
    val w = Window.partitionBy(col("lang"))
      .orderBy(md5Long(concat(lit("strat:"), col("doc_id"))), col("doc_id"))
    doc.withColumn("rk", row_number().over(w))
      .join(broadcast(targets), "lang")
      .filter(col("rk") <= col("target"))
      .select(col("doc_id"), col("lang"))
      .orderBy("doc_id")
  }

  /** Global sample size for [[reservoir]]. */
  val ReservoirK = 64

  /** Exact-K uniform sample without replacement — the distributed,
    * deterministic analog of reservoir sampling: rank every row by a salted
    * content hash (a uniform random permutation, fixed by the salt) and
    * keep the K smallest. Spark plans orderBy+limit as TakeOrdered: each
    * partition forwards only its local top-K, so K rows per partition —
    * never the corpus — cross the network, the same property the classic
    * single-pass reservoir gives a sequential reader. Unlike `df.sample`
    * (per-split seeded, count only approximate) the result is exactly K
    * rows and identical on any cluster layout.
    */
  def reservoir(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(col("doc_id"), col("source"),
        md5Long(concat(lit("res:"), col("doc_id"))).as("h"))
      .orderBy(col("h"), col("doc_id"))
      .limit(ReservoirK)
      .select(col("doc_id"), col("source"))
      .orderBy("doc_id")

  /** Shard count for the deterministic training shuffle. Constant 32 keeps
    * the oracle output reviewable; at 100 TB this would be O(100k) shards
    * (shard ≈ one training-reader file), which only RAISES the available
    * parallelism — the plan below is shard-count-agnostic.
    */
  private val ShuffleShards = 32

  /** Deterministic global training shuffle + sharding: every document gets
    * a salted-hash (shard, pos) coordinate and its within-shard sequence
    * number — the "shuffle" every epoch-reproducible training pipeline
    * runs over its corpus. At 100 TB a true random permutation is a full
    * corpus sort; the hash coordinate makes the assignment a pure
    * PROJECTION (no shuffle at all), and the within-shard ordering is one
    * hash-partitioned sort — which is exactly the physical layout a
    * shard-per-file training reader wants to consume, so the sort is the
    * write, not an extra pass. md5-derived on both engines: the same
    * corpus always yields the same epoch order, run-to-run and
    * engine-to-engine.
    */
  def shuffleShard(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("shard")).orderBy(col("pos"), col("doc_id"))
    documents(s, d)
      .select(col("doc_id"),
        (md5Long(concat(lit("shard:"), col("doc_id"))) % ShuffleShards).as("shard"),
        md5Long(concat(lit("pos:"), col("doc_id"))).as("pos"))
      .withColumn("seq", row_number().over(w).cast("long"))
      .select(col("shard"), col("seq"), col("doc_id"), col("pos"))
      .orderBy("shard", "seq")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sample_shuffle_shard" -> (shuffleShard _),
    "sample_stratified"   -> (stratified _),
    "sample_reservoir"    -> (reservoir _),
    "sample_balanced"     -> (balanced _),
    "sample_holdout"      -> (holdout _),
    "sample_dsir"         -> (dsir _),
    "sample_interleave"   -> (interleave _),
    "sample_mixture"      -> (mixture _),
    "sample_token_budget" -> (tokenBudget _),
    "sample_pack"         -> (pack _),
    "sample_temperature"  -> (temperature _),
    "sample_epoch_plan"   -> (epochPlan _),
    "sample_dedup_budget" -> (dedupBudget _)
  )

  val oracles: Map[String, String] = Map(
    "sample_shuffle_shard" ->
      s"""WITH coords AS (SELECT doc_id,
             ${md5LongSql("'shard:' || doc_id")} % $ShuffleShards AS shard,
             ${md5LongSql("'pos:' || doc_id")} AS pos
           FROM documents)
         SELECT shard,
           CAST(row_number() OVER (PARTITION BY shard
                                   ORDER BY pos, doc_id) AS BIGINT) AS seq,
           doc_id, pos
         FROM coords ORDER BY shard, seq""",
    "sample_stratified" ->
      s"""WITH targets AS (SELECT lang,
             greatest(1, CAST(count(*) AS BIGINT) * $StratPct // 100) AS target
           FROM documents GROUP BY lang),
         ranked AS (SELECT doc_id, lang,
             row_number() OVER (PARTITION BY lang
               ORDER BY ${md5LongSql("'strat:' || doc_id")}, doc_id) AS rk
           FROM documents)
         SELECT doc_id, lang FROM ranked JOIN targets USING (lang)
         WHERE rk <= target ORDER BY doc_id""",
    "sample_reservoir" ->
      s"""SELECT doc_id, source FROM (
           SELECT doc_id, source FROM documents
           ORDER BY ${md5LongSql("'res:' || doc_id")}, doc_id
           LIMIT $ReservoirK)
         ORDER BY doc_id""",
    "sample_balanced" ->
      s"""WITH ranked AS (SELECT doc_id, lang,
             row_number() OVER (PARTITION BY lang
               ORDER BY ${md5LongSql("'bal:' || doc_id")}, doc_id) AS rk
           FROM documents),
         mn AS (SELECT min(n) AS min_n FROM
           (SELECT lang, count(*) AS n FROM documents GROUP BY lang))
         SELECT doc_id, lang FROM ranked, mn
         WHERE rk <= min_n ORDER BY doc_id""",
    "sample_holdout" ->
      s"""SELECT doc_id,
         CASE WHEN ${md5LongSql("'split:' || doc_id")} % 100 < 80 THEN 'train'
              WHEN ${md5LongSql("'split:' || doc_id")} % 100 < 90 THEN 'val'
              ELSE 'test' END AS split
         FROM documents ORDER BY doc_id""",
    "sample_dsir" ->
      s"""WITH toks AS (SELECT doc_id, lang,
             ${md5LongSql("'dsir:' || tok")} % $DsirBuckets AS b
           FROM (SELECT doc_id, lang,
                   unnest(string_split(lower(text), ' ')) AS tok
                 FROM documents)
           WHERE tok <> ''),
         counts AS (SELECT b, CAST(count(*) AS BIGINT) AS cr,
             CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS ct
           FROM toks GROUP BY b),
         totals AS (SELECT CAST(sum(cr) AS BIGINT) AS nr,
             CAST(sum(ct) AS BIGINT) AS nt FROM counts),
         weights AS (SELECT b, ${graft.core.Determinism.r6Sql(
               s"log2((CAST(ct + 1 AS DOUBLE) * CAST(nr + $DsirBuckets AS DOUBLE)) / " +
               s"(CAST(cr + 1 AS DOUBLE) * CAST(nt + $DsirBuckets AS DOUBLE)))")} AS w
           FROM counts, totals),
         scored AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
             CAST(sum(CAST(w AS DECIMAL(28,6))) AS DOUBLE) AS wsum
           FROM toks JOIN weights USING (b) GROUP BY doc_id)
         SELECT doc_id, n_tokens,
           ${graft.core.Determinism.r4Sql("wsum / n_tokens")} AS score_per_token
         FROM scored ORDER BY doc_id""",
    "sample_interleave" ->
      """WITH src AS (SELECT doc_id, CAST(doc_id % 4 AS INTEGER) AS source
           FROM documents),
         ranked AS (SELECT doc_id, source,
             row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rk
           FROM src)
         SELECT doc_id, source, (rk - 1) * 4 + source AS order_index
         FROM ranked ORDER BY order_index""",
    "sample_mixture" -> {
      val rateSql = MixRates.toSeq.sorted
        .map { case (k, v) => s"WHEN doc_id % 4 = $k THEN $v" }.mkString(" ")
      s"""SELECT doc_id, CAST(doc_id % 4 AS INTEGER) AS source,
         ${md5LongSql("'mix:' || doc_id")} % 10000 AS coin
         FROM documents
         WHERE ${md5LongSql("'mix:' || doc_id")} % 10000 < (CASE $rateSql ELSE 0 END)
         ORDER BY doc_id"""
    },
    "sample_token_budget" ->
      s"""WITH toks AS (SELECT doc_id, CAST(doc_id % 4 AS INTEGER) AS source,
             CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS n_tokens
           FROM documents),
         cum AS (SELECT *, sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tokens
           FROM toks)
         SELECT source, doc_id, n_tokens, CAST(cum_tokens AS BIGINT) AS cum_tokens
         FROM cum WHERE cum_tokens - n_tokens < $TokenBudget
         ORDER BY source, doc_id""",
    "sample_pack" ->
      s"""WITH toks AS (SELECT doc_id, CAST(doc_id % $PackShards AS INTEGER) AS shard,
             CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS n_tokens
           FROM documents),
         cum AS (SELECT *,
             CAST(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens
             AS BIGINT) AS off
           FROM toks)
         SELECT shard, doc_id, n_tokens,
           off // $SeqLen AS seq_id,
           off % $SeqLen AS offset_in_seq,
           (off + greatest(n_tokens, CAST(1 AS BIGINT)) - 1) // $SeqLen
             - off // $SeqLen + 1 AS n_seqs
         FROM cum ORDER BY shard, doc_id""",
    "sample_temperature" ->
      s"""WITH src AS (SELECT doc_id, CAST(doc_id % 4 AS INTEGER) AS source
           FROM documents),
         counts AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             sqrt(CAST(count(*) AS DOUBLE)) / CAST(count(*) AS DOUBLE) AS r
           FROM src GROUP BY source),
         norm AS (SELECT max(r) AS rmax FROM counts),
         rates AS (SELECT source, n_docs,
             CAST(floor(r / rmax * 10000.0) AS BIGINT) AS rate_bps
           FROM counts, norm),
         sel AS (SELECT s.source, CAST(count(*) AS BIGINT) AS n_sel
           FROM src s JOIN rates rt ON rt.source = s.source
           WHERE ${md5LongSql("'temp:' || doc_id")} % 10000 < rt.rate_bps
           GROUP BY s.source)
         SELECT r2.source, r2.n_docs, r2.rate_bps,
           COALESCE(sel.n_sel, CAST(0 AS BIGINT)) AS n_sel
         FROM rates r2 LEFT JOIN sel ON sel.source = r2.source
         ORDER BY r2.source""",
    "sample_dedup_budget" ->
      s"""WITH RECURSIVE ${Dedup.softWeightSqlCtes},
         tk AS (SELECT doc_id % ${Dedup.ExactOffset} AS orig_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens, weight
           FROM doc_w),
         dsrc AS (SELECT doc_id AS orig_id, source FROM documents),
         per0 AS (SELECT s.source,
             CAST(sum(n_tokens) AS BIGINT) AS raw_tokens,
             CAST(sum(CAST(
               ${graft.core.Determinism.r4Sql("weight * n_tokens")}
               AS DECIMAL(28,6))) AS DOUBLE) AS eff0
           FROM tk t JOIN dsrc s ON s.orig_id = t.orig_id GROUP BY 1),
         per AS (SELECT source, raw_tokens,
             ${graft.core.Determinism.r4Sql("eff0")} AS eff_tokens FROM per0),
         tot AS (SELECT CAST(sum(CAST(
             ${graft.core.Determinism.r6Sql("sqrt(eff_tokens)")}
             AS DECIMAL(28,6))) AS DOUBLE) AS wsum FROM per)
         SELECT source, raw_tokens, eff_tokens,
           ${graft.core.Determinism.r4Sql(
             "eff_tokens / CAST(raw_tokens AS DOUBLE)")} AS dedup_ratio,
           ${graft.core.Determinism.r6Sql(
             graft.core.Determinism.r6Sql("sqrt(eff_tokens)") + " / wsum")} AS weight,
           ${graft.core.Determinism.r4Sql(
             graft.core.Determinism.r6Sql(
               graft.core.Determinism.r6Sql("sqrt(eff_tokens)") + " / wsum")
               + s" * $EpochBudget")} AS target_tokens
         FROM per, tot ORDER BY source""",
    "sample_epoch_plan" ->
      s"""WITH toks AS (SELECT source,
             CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS n_tokens
           FROM documents),
         per AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(n_tokens) AS BIGINT) AS avail_tokens
           FROM toks GROUP BY source),
         tot AS (SELECT CAST(sum(CAST(
             ${graft.core.Determinism.r6Sql("sqrt(CAST(avail_tokens AS DOUBLE))")}
             AS DECIMAL(28,6))) AS DOUBLE) AS wsum FROM per),
         w AS (SELECT source, n_docs, avail_tokens,
             ${graft.core.Determinism.r6Sql(
               graft.core.Determinism.r6Sql("sqrt(CAST(avail_tokens AS DOUBLE))")
                 + " / wsum")} AS weight
           FROM per, tot),
         t AS (SELECT *,
             ${graft.core.Determinism.r4Sql(s"weight * $EpochBudget")}
               AS target_tokens FROM w),
         e AS (SELECT *,
             ${graft.core.Determinism.r4Sql(
               s"least($MaxEpochs, target_tokens / CAST(greatest(avail_tokens, 1) AS DOUBLE))")}
               AS epochs,
             ${graft.core.Determinism.r4Sql(
               s"least(target_tokens, CAST(avail_tokens AS DOUBLE) * $MaxEpochs)")}
               AS effective_tokens
           FROM t)
         SELECT source, n_docs, avail_tokens, weight, target_tokens, epochs,
           effective_tokens,
           ${graft.core.Determinism.r4Sql("target_tokens - effective_tokens")}
             AS deficit_tokens
         FROM e ORDER BY source"""
  )
}
