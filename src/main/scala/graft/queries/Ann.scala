package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.Tables._
import graft.functions.HashFunctions._

/** Approximate-nearest-neighbor search over the embedding column
  * (SURVEY.md §2 "similarity search").
  *
  * Scale design: probes are a tiny broadcast set (k×d floats), so the
  * brute-force pass is a map-side broadcast nested-loop — the corpus is
  * never shuffled; per-probe top-k is a window over the probe partition.
  * The LSH variant buckets the corpus once with deterministic
  * random-hyperplane signs (md5-derived, engine-portable) and joins probes
  * only against matching buckets — the reusable index path at 100 TB.
  *
  * Dot products fold doubles strictly left-to-right (Dedup.dotSeq ≡ DuckDB
  * list_reduce) so cosine scores — and therefore rankings — are
  * bit-identical across engines; hyperplane sign dots stay decimal-exact
  * (grouped sums have no defined order).
  */
object Ann {

  private val TOPK = 5
  private val PLANES = 6 // 64 buckets

  /** Embeddings as double vectors.
    * spread: the single-row-group source otherwise serializes every dot
    * product onto one scan task (see Tables.spread).
    */
  private def vecs(s: SparkSession, d: String): DataFrame =
    graft.core.Tables.spread(
      embeddings(s, d).select(col("vec_id"),
        // array cast, not transform(_.cast): the HOF is CodegenFallback
        // (one boxed lambda per element, and it breaks the whole-stage
        // span feeding every graft_dot); Cast(array<float>→array<double>)
        // is the same element-wise widening inside codegen (round r14,
        // guide §4 — the class r13 purged from the dot products)
        col("embedding").cast("array<double>").as("v")))

  /** Fixed-size deterministic hash panel: the `n` vec_ids with the smallest
    * salted md5 (vec_id tie-break). `orderBy + limit` compiles to
    * TakeOrderedAndProject — a per-partition bounded heap merged on the
    * driver — so selection is one O(N) map pass yielding a CONSTANT-size
    * result no matter the corpus. This is what makes the probe set and the
    * IVF codebook corpus-size-independent: at 100 TB the panel is still
    * `n` rows, so "probes/centroids broadcast" stays true by construction
    * (the old `vec_id % MOD` selection grew linearly with the corpus).
    */
  private def panel(df: DataFrame, salt: String, n: Int): DataFrame =
    df.select(col("vec_id"),
        md5Long(concat(lit(salt), col("vec_id"))).as("h"))
      .orderBy(col("h"), col("vec_id"))
      .limit(n)
      .select("vec_id")

  /** Panel ids, exposed for the corpus-size-independence spec. */
  private[graft] def probePanelIds(s: SparkSession, d: String): Seq[Long] =
    panel(vecs(s, d), "probe:", PROBE_COUNT).collect().map(_.getLong(0)).toSeq
  private[graft] def centPanelIds(s: SparkSession, d: String): Seq[Long] =
    panel(vecs(s, d), "cent:", CENT_COUNT).collect().map(_.getLong(0)).toSeq
  private[graft] def entryPanelIds(s: SparkSession, d: String): Seq[Long] =
    panel(vecs(s, d), "entry:", GS_ENTRIES).collect().map(_.getLong(0)).toSeq

  private def cosCols(dot: Column, na: Column, nb: Column): Column =
    dot / sqrt(na * nb)

  // ---- exact top-k cosine neighbors for the probe set ---------------------
  def bruteforce(s: SparkSession, d: String): DataFrame = {
    val all = vecs(s, d)
    // materialized once: feeds BOTH the probe and corpus branches — without
    // it Catalyst re-runs the scan+norm pipeline per branch
    val norms = all.select(col("vec_id"),
      graft.plans.DotProduct.dot(col("v"), col("v")).as("nrm"))
      .join(all, "vec_id")
      .localCheckpoint()
    val probes = norms.join(broadcast(panel(norms, "probe:", PROBE_COUNT)), "vec_id")
      .toDF("probe_id", "pnrm", "pv")
    val corpus = norms.toDF("neighbor_id", "cnrm", "cv")
    val scored = corpus.join(broadcast(probes),
        col("probe_id") =!= col("neighbor_id"))
      .withColumn("cos", cosCols(
        graft.plans.DotProduct.dot(col("pv"), col("cv")),
        col("pnrm"), col("cnrm")))
      .select("probe_id", "neighbor_id", "cos")
    rankTop(scored, TOPK)
  }

  /** Similarity threshold for [[rangeSearch]] — range queries return ALL
    * neighbors at least this similar, however many there are (the dual of
    * top-k, for "find every candidate above the match bar" workloads:
    * retrieval filtering, dedup candidate listing).
    */
  val RangeTau = 0.25

  /** Range similarity search: every (probe, neighbor) pair with cosine ≥
    * [[RangeTau]], exact. Same broadcast-probes/corpus-never-shuffled shape
    * as bruteforce, but the threshold filter replaces the bounded heap —
    * output size is data-dependent by definition, so the operator keeps the
    * full scored relation out of any sort and orders only the survivors.
    */
  def rangeSearch(s: SparkSession, d: String): DataFrame = {
    val all = vecs(s, d)
    val norms = all.select(col("vec_id"),
      graft.plans.DotProduct.dot(col("v"), col("v")).as("nrm"))
      .join(all, "vec_id")
      .localCheckpoint()
    val probes = norms.join(broadcast(panel(norms, "probe:", PROBE_COUNT)), "vec_id")
      .toDF("probe_id", "pnrm", "pv")
    val corpus = norms.toDF("neighbor_id", "cnrm", "cv")
    corpus.join(broadcast(probes), col("probe_id") =!= col("neighbor_id"))
      .withColumn("cos", cosCols(
        graft.plans.DotProduct.dot(col("pv"), col("cv")),
        col("pnrm"), col("cnrm")))
      .filter(col("cos") >= RangeTau)
      .select(col("probe_id"), col("neighbor_id"),
        graft.core.Determinism.r4(col("cos")).as("cos"))
      .orderBy("probe_id", "neighbor_id")
  }

  /** Filtered vector search — exact top-k restricted to neighbors sharing
    * the probe's metadata label (the "filtered ANN" shape every vector
    * store exposes: predicate + similarity). The filter rides INSIDE the
    * broadcast join condition, so non-matching neighbors are dropped
    * before any scoring and the corpus still never shuffles; with a
    * selective predicate this does strictly less work than unfiltered
    * search (pre-filtering, not post-filtering — post would k-starve
    * selective predicates).
    */
  def filterSearch(s: SparkSession, d: String): DataFrame = {
    val v = graft.core.Tables.spread(embeddings(s, d).select(col("vec_id"),
      col("embedding").cast("array<double>").as("v"), // codegen cast, see vecs
      col("label").cast("int").as("label")))
    val norms = v.select(col("vec_id"),
      graft.plans.DotProduct.dot(col("v"), col("v")).as("nrm"))
      .join(v, "vec_id").localCheckpoint() // vec_id, nrm, v, label
    val probes = norms.join(broadcast(panel(norms, "probe:", PROBE_COUNT)), "vec_id")
      .toDF("probe_id", "pnrm", "pv", "plabel")
    val corpus = norms.toDF("neighbor_id", "cnrm", "cv", "clabel")
    val scored = corpus.join(broadcast(probes),
        col("probe_id") =!= col("neighbor_id") && col("clabel") === col("plabel"))
      .withColumn("cos", cosCols(
        graft.plans.DotProduct.dot(col("pv"), col("cv")),
        col("pnrm"), col("cnrm")))
      .select(col("probe_id"), col("plabel").as("label"),
        col("neighbor_id"), col("cos"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= CAND_TOPK)
      .select(col("probe_id"), col("label"), col("rk"), col("neighbor_id"),
        graft.core.Determinism.r4(col("cos")).as("cos"))
      .orderBy("probe_id", "rk")
  }

  /** Per-probe top-k + rank: the bounded-heap TopK operator cuts the scored
    * relation to k rows per probe WITHOUT sorting it (Spark's own
    * WindowGroupLimit still sorts the full input before limiting); the
    * row_number window then ranks only the ≤ k·probes survivors.
    */
  private def rankTop(scored: DataFrame, k: Int): DataFrame = {
    val kept = graft.plans.TopK.perKey(scored, Seq("probe_id"),
      Seq(col("cos").desc, col("neighbor_id").asc), k)
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    kept.withColumn("rk", row_number().over(w))
      .select(col("probe_id"), col("rk"), col("neighbor_id"),
        graft.core.Determinism.r4(col("cos")).as("cos"))
      .orderBy("probe_id", "rk")
  }

  // ---- random-hyperplane LSH: bucket corpus once, probe hits its bucket ---
  /** Deterministic ±1 hyperplane components: plane p, dimension d. */
  private def planes(s: SparkSession): DataFrame = {
    val p = s.range(PLANES).toDF("p")
    val dim = s.range(64).toDF("dim")
    p.crossJoin(dim).select(col("p"), col("dim"),
      (md5Long(concat(lit("pl:"), col("p"), lit(":"), col("dim")))
        .bitwiseAND(1) * 2 - 1).cast("double").as("comp"))
  }

  /** 64-bucket signature for every (vec_id, v) row — reused by ann_lsh and
    * the LSH-blocked embedding dedup.
    */
  private[queries] def bucketsOf(vecsDf: DataFrame): DataFrame = {
    val s = vecsDf.sparkSession
    val elems = vecsDf.select(col("vec_id"),
      posexplode(col("v")).as(Seq("dim", "x")))
    // hyperplane sign dots need an ORDER-FREE exact sum (grouped sums have
    // no defined order). Scaled-long accumulation gives that at long-add
    // speed: x*comp*1e9 is the same IEEE double in both engines, floor of
    // it the same integer — where a decimal(30,15) sum pays BigDecimal
    // boxing on every row. 1e-9 sign resolution only moves buckets for
    // |pdot| < 64e-9, identically in both engines.
    val pdots = elems.join(broadcast(planes(s)), "dim")
      .groupBy(col("vec_id"), col("p"))
      .agg(sum(floor(col("x") * col("comp") * 1e9).cast("long")).as("pdot"))
    pdots.groupBy(col("vec_id"))
      .agg(sum(when(col("pdot") > 0,
          expr("shiftleft(CAST(1 AS BIGINT), CAST(p AS INT))"))
        .otherwise(0L)).as("bucket"))
  }

  /** Hamming-1 multiprobe (standard multiprobe LSH): each probe visits its
    * own sign bucket plus the PLANES buckets one bit-flip away — the cells
    * a near-boundary neighbor most likely fell into. The corpus stays
    * bucketed ONCE; only the tiny broadcast probe set expands (×(PLANES+1)),
    * so the join shape — and its 100 TB behavior — is unchanged while
    * recall strictly improves (asserted in AnnTextSpec).
    */
  def lsh(s: SparkSession, d: String): DataFrame =
    lshImpl(s, d, multiprobe = true)

  private[graft] def lshImpl(s: SparkSession, d: String,
                             multiprobe: Boolean): DataFrame = {
    val all = vecs(s, d)
    val norms = all.select(col("vec_id"),
      graft.plans.DotProduct.dot(col("v"), col("v")).as("nrm"))
    // materialized once: probe and corpus branches would otherwise each
    // recompute the norm + hyperplane-bucket pipelines
    val withB = all.join(norms, "vec_id").join(bucketsOf(all), "vec_id")
      .localCheckpoint()
    val probes0 = withB.join(broadcast(panel(withB, "probe:", PROBE_COUNT)), "vec_id")
      .toDF("probe_id", "pv", "pnrm", "bucket")
    val probes =
      if (!multiprobe) probes0
      else probes0.select(col("probe_id"), col("pv"), col("pnrm"),
        explode(array(col("bucket") +:
          (0 until PLANES).map(i => col("bucket").bitwiseXOR(lit(1L << i))): _*))
          .as("bucket"))
    // each corpus vector lives in exactly one bucket and a probe's
    // (PLANES+1) probed buckets are distinct values, so a (probe, neighbor)
    // pair can match at most once — no dedup needed
    val corpus = withB.toDF("neighbor_id", "cv", "cnrm", "bucket")
    val cand = corpus.join(broadcast(probes), Seq("bucket"))
      .filter(col("probe_id") =!= col("neighbor_id"))
      .withColumn("cos", cosCols(
        graft.plans.DotProduct.dot(col("pv"), col("cv")),
        col("pnrm"), col("cnrm")))
      .select("probe_id", "neighbor_id", "cos")
    rankTop(cand, CAND_TOPK)
  }

  // ---- IVF-flat: coarse quantizer buckets, probe visits nProbe cells ------
  private val NPROBE = 2
  private val CAND_TOPK = 3      // top-k for the bucketed variants (lsh, ivf)
  private[graft] val CENT_COUNT = 16    // FIXED codebook size — never grows with N
  private val PROBE_COUNT = 10   // FIXED probe panel size — never grows with N

  /** IVF coarse quantization with a deterministic hash-sampled codebook of
    * CONSTANT size CENT_COUNT (engine-portable, unlike k-means): coarse
    * assignment is N×K map-side work with K fixed, and the centroid
    * broadcast is K rows at any corpus size.
    * Returns (corpus cell assignment, probe→probed cells); exposed for the
    * spec's cell-scoping assertion. Coarse assignment is centroids×corpus
    * map-side work (centroids broadcast).
    */
  private[graft] def ivfCells(s: SparkSession, d: String): (DataFrame, DataFrame) =
    ivfCells(withNorms(s, d))

  /** (vec_id, v, nrm), materialized once per query — shared by the
    * codebook, the coarse assignment, and the probe/corpus branches (four
    * consumers; without the checkpoint each re-runs scan + norms).
    */
  private def withNorms(s: SparkSession, d: String): DataFrame = {
    val all = vecs(s, d)
    val norms = all.select(col("vec_id"),
      graft.plans.DotProduct.dot(col("v"), col("v")).as("nrm"))
    all.join(norms, "vec_id").select("vec_id", "v", "nrm").localCheckpoint()
  }

  private def ivfCells(withN: DataFrame): (DataFrame, DataFrame) = {
    val cents = withN.join(broadcast(panel(withN, "cent:", CENT_COUNT)), "vec_id")
      .toDF("cent_id", "cv", "cnrm")
    // similarity of every vector to every centroid (centroids broadcast)
    val sims = withN.join(broadcast(cents), lit(true))
      .select(col("vec_id"), col("cent_id"),
        cosCols(graft.plans.DotProduct.dot(col("v"), col("cv")),
          col("nrm"), col("cnrm")).as("csim"))
    val byVec = Window.partitionBy(col("vec_id"))
      .orderBy(col("csim").desc, col("cent_id"))
    // materialized once: feeds both the assignment and probe-cells branches
    val ranked = sims.withColumn("crk", row_number().over(byVec))
      .localCheckpoint()
    val assignment = ranked.filter(col("crk") === 1)
      .select(col("vec_id"), col("cent_id").as("cell"))
    val probeCells = ranked
      .join(broadcast(panel(withN, "probe:", PROBE_COUNT)), "vec_id")
      .filter(col("crk") <= NPROBE)
      .select(col("vec_id").as("probe_id"), col("cent_id").as("cell"))
    (assignment, probeCells)
  }

  /** The (probe, neighbor, cos) candidate relation the IVF search scans —
    * factored out so the bench scale probe can COUNT scanned candidates
    * (the cardinality that certifies the NPROBE-cell-bounded scan stays
    * ∝ N/CENT_COUNT per probe) independently of wall-clock noise.
    */
  private[graft] def ivfCandidates(s: SparkSession, d: String): DataFrame = {
    val withN = withNorms(s, d)
    val (assignment, probeCells) = ivfCells(withN)
    val corpus = withN.join(assignment, "vec_id")
      .toDF("neighbor_id", "cv2", "cnrm2", "cell")
    val probes = withN.toDF("probe_id", "pv", "pnrm")
      .join(probeCells, "probe_id")
    // no dedup needed: each neighbor lives in exactly one cell (crk = 1 is
    // unique), so a (probe, neighbor) pair can match at most once
    corpus.join(broadcast(probes), Seq("cell"))
      .filter(col("probe_id") =!= col("neighbor_id"))
      .select(col("probe_id"), col("neighbor_id"),
        cosCols(graft.plans.DotProduct.dot(col("pv"), col("cv2")),
          col("pnrm"), col("cnrm2")).as("cos"))
  }

  def ivf(s: SparkSession, d: String): DataFrame =
    rankTop(ivfCandidates(s, d), CAND_TOPK)

  // ---- Product quantization (PQ) + asymmetric distance (ADC) --------------
  private val PQ_S = 8         // subspaces over the 64-dim vectors
  private val PQ_SUBDIM = 8    // dims per subspace
  private val PQ_K = 16        // codebook entries per subspace (fixed hash panel)
  private val PQ_SHORTLIST = 20 // ADC shortlist size fed to the exact rerank

  /** PQ-encoded approximate inner-product search — the standard
    * billion-scale two-stage shape: (1) each corpus vector is stored as
    * PQ_S small codes (512 bytes → 8), and a probe scores every neighbor by
    * summing per-subspace lookup-table entries (asymmetric distance, ADC)
    * WITHOUT touching the vector; (2) the ADC top-PQ_SHORTLIST per probe is
    * re-scored with the exact dot product (rerank) — quantization only has
    * to keep the true neighbors inside the shortlist, not rank them.
    * Shapes at 100 TB: the codebook and probe LUT are tiny broadcasts
    * (both FIXED-size hash panels), encoding is one map pass, ADC scoring
    * joins the code relation to the broadcast LUT (N×PQ_S rows, no N²),
    * and the exact rerank touches only probes×shortlist vectors.
    *
    * Determinism: partial dot products fold left-to-right (dotSeq), are
    * floor-scaled to longs (the bucketsOf trick), and the ADC sum
    * accumulates LONGS — grouped doubles have no defined order, longs are
    * exact in any order, so scores are bit-identical across engines.
    */
  /** Per-subspace slice of a vector column (1-based `slice`). */
  private def subvec(v: Column, sub: Column): Column =
    slice(v, sub * PQ_SUBDIM + 1, lit(PQ_SUBDIM))

  /** The `pq:` hash-panel centroids — the fixed PQ codebook source. */
  private def pqCents(withN: DataFrame): DataFrame =
    withN.join(broadcast(panel(withN, "pq:", PQ_K)), "vec_id")
      .select(col("vec_id").as("cent_id"), col("v").as("cv"))

  /** PQ encode: per (vector, subspace) the codebook entry with the best
    * sub-dot — the (neighbor_id, sub, code) relation shared by the ADC
    * search ([[pq]]) and the codebook-training step ([[pqTrain]]). One map
    * pass against the broadcast codebook; N·PQ_S rows out.
    */
  private def pqCodes(withN: DataFrame): DataFrame = {
    val subs = explode(sequence(lit(0), lit(PQ_S - 1))).as("sub")
    val pairs = withN.select(col("vec_id"), col("v"), subs)
      .join(broadcast(pqCents(withN)), lit(true))
      .select(col("vec_id"), col("sub"), col("cent_id"),
        graft.plans.DotProduct.dot(subvec(col("v"), col("sub")),
          subvec(col("cv"), col("sub"))).as("subdot"))
    val bySub = Window.partitionBy(col("vec_id"), col("sub"))
      .orderBy(col("subdot").desc, col("cent_id"))
    pairs.withColumn("crk", row_number().over(bySub))
      .filter(col("crk") === 1)
      .select(col("vec_id").as("neighbor_id"), col("sub"),
        col("cent_id").as("code"))
  }

  def pq(s: SparkSession, d: String): DataFrame = {
    val withN = withNorms(s, d)
    val cents = pqCents(withN)
    val subs = explode(sequence(lit(0), lit(PQ_S - 1))).as("sub")
    // encode: per (vector, subspace) the centroid with the best sub-dot
    val codes = pqCodes(withN)
    // probe LUT: probe × subspace × centroid partial dots, floor-scaled
    val lut = withN.join(broadcast(panel(withN, "probe:", PROBE_COUNT)), "vec_id")
      .select(col("vec_id").as("probe_id"), col("v").as("pv"), subs)
      .join(broadcast(cents), lit(true))
      .select(col("probe_id"), col("sub"), col("cent_id").as("code"),
        floor(graft.plans.DotProduct.dot(subvec(col("pv"), col("sub")),
          subvec(col("cv"), col("sub"))) * 1e9).cast("long").as("pdot"))
    val scored = codes.join(broadcast(lut), Seq("sub", "code"))
      .filter(col("probe_id") =!= col("neighbor_id"))
      .groupBy(col("probe_id"), col("neighbor_id"))
      .agg(sum(col("pdot")).as("iscore"))
    // stage 1: ADC shortlist (bounded heap, no sort of the full scored set)
    val shortlist = graft.plans.TopK.perKey(scored, Seq("probe_id"),
      Seq(col("iscore").desc, col("neighbor_id").asc), PQ_SHORTLIST)
      .select(col("probe_id"), col("neighbor_id"))
    // stage 2: exact rerank of probes×shortlist only
    val probeVecs = withN
      .join(broadcast(panel(withN, "probe:", PROBE_COUNT)), "vec_id")
      .select(col("vec_id").as("probe_id"), col("v").as("pv"))
    val reranked = withN.select(col("vec_id").as("neighbor_id"), col("v").as("nv"))
      .join(broadcast(shortlist), Seq("neighbor_id"))
      .join(broadcast(probeVecs), Seq("probe_id"))
      .select(col("probe_id"), col("neighbor_id"),
        graft.plans.DotProduct.dot(col("pv"), col("nv")).as("dot"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("dot").desc, col("neighbor_id"))
    reranked.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= CAND_TOPK)
      .select(col("probe_id"), col("rk"), col("neighbor_id"),
        graft.core.Determinism.r4(col("dot")).as("dot"))
      .orderBy("probe_id", "rk")
  }

  // ---- Scalar quantization (SQ8) + integer scoring + exact rerank ---------
  private val SQ_SHORTLIST = 20

  /** SQ8-encoded approximate inner-product search — the fourth index
    * family: every coordinate quantizes to a SIGNED 8-bit level against
    * one corpus-wide symmetric scale (q = round(x·127/max|x|), 64 bytes
    * per vector instead of 512), probes score neighbors with pure INTEGER
    * dot products over the codes, and the top-[[SQ_SHORTLIST]] per probe
    * is reranked with the exact double dot (like PQ, quantization only
    * has to keep true neighbors inside the shortlist).
    *
    * The scale is deliberately per-TENSOR symmetric, not per-dim affine:
    * Σqp·qn ≈ (127/max|x|)²·Σxp·xn, a monotone proxy of the true inner
    * product up to rounding noise — an affine per-dim [min,max] mapping
    * injects per-vector offset terms that swamp the signal (measured
    * recall 0.03 vs 1.00 on this corpus at every sf) and correcting them breaks the
    * integer-exactness that makes this index determinism-free.
    *
    * Shapes at 100 TB: the scale is ONE partially-aggregated max|x| pass
    * broadcast as a single value; quantization is map-side; scoring is
    * the brute-force broadcast nested-loop over 8× smaller codes (and
    * composes with an IVF cell restriction to bound it further); the
    * rerank touches only probes×shortlist vectors. Determinism is free:
    * integer scores are exact in ANY accumulation order, so no float
    * folding discipline is needed until the final rerank (dotSeq).
    */
  def sq8(s: SparkSession, d: String): DataFrame = {
    val base = vecs(s, d)
    val rng = base.select(explode(col("v")).as("x"))
      .agg(max(abs(col("x"))).as("mx"))
    val q = base.crossJoin(broadcast(rng))
      .select(col("vec_id"),
        // codegen quantizer instead of the transform(...) HOF (round r14,
        // guide §4): same per-element arithmetic — floor(x·127/mx + 0.5)
        // with the mx=0 guard — compiled into the whole-stage span instead
        // of one interpreted lambda per element over every corpus vector
        graft.plans.ArrayQuantizeSq8.quantize(col("v"), col("mx")).as("qv"))
    val probes = q.join(broadcast(panel(base, "probe:", PROBE_COUNT)), "vec_id")
      .toDF("probe_id", "qp")
    val scored = q.toDF("neighbor_id", "qn")
      .join(broadcast(probes), col("probe_id") =!= col("neighbor_id"))
      .select(col("probe_id"), col("neighbor_id"),
        graft.plans.DotProductLong.dot(col("qp"), col("qn")).as("iscore"))
    val shortlist = graft.plans.TopK.perKey(scored, Seq("probe_id"),
      Seq(col("iscore").desc, col("neighbor_id").asc), SQ_SHORTLIST)
      .select(col("probe_id"), col("neighbor_id"))
    val probeVecs = base.join(broadcast(panel(base, "probe:", PROBE_COUNT)), "vec_id")
      .select(col("vec_id").as("probe_id"), col("v").as("pv"))
    val reranked = base.select(col("vec_id").as("neighbor_id"), col("v").as("nv"))
      .join(broadcast(shortlist), Seq("neighbor_id"))
      .join(broadcast(probeVecs), Seq("probe_id"))
      .select(col("probe_id"), col("neighbor_id"),
        graft.plans.DotProduct.dot(col("pv"), col("nv")).as("dot"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("dot").desc, col("neighbor_id"))
    reranked.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= CAND_TOPK)
      .select(col("probe_id"), col("rk"), col("neighbor_id"),
        graft.core.Determinism.r4(col("dot")).as("dot"))
      .orderBy("probe_id", "rk")
  }

  // ---- IVF-PQ: coarse cells + residual product quantization -------------
  /** IVF-PQ — the production billion-scale index shape (FAISS IndexIVFPQ):
    * [[ivf]]'s coarse quantizer prunes the corpus to NPROBE cells, and
    * within a cell each vector is stored as PQ codes of its RESIDUAL
    * v − centroid(cell) (residuals cluster near the origin, so the same
    * code budget quantizes them far more finely than raw vectors). A probe
    * scores candidates as ⟨p, centroid⟩ + Σ_sub LUT[sub, code] — the
    * coarse term plus the residual ADC sum — then exact-reranks its
    * shortlist, composing both approximations it ships with recall gates
    * for ([[recallEvalIvfPq]]).
    *
    * Shapes at 100 TB: everything the probe needs (probed-cell list,
    * coarse terms, residual LUT) is a fixed-size broadcast (probes ×
    * NPROBE × PQ_S × PQ_K rows); encoding is one map pass over the corpus
    * (assignment join + broadcast centroids/codebook); candidate scoring
    * joins the code relation to the broadcast LUT scoped by (cell, sub,
    * code) — only vectors in probed cells produce rows. Determinism: the
    * PQ recipe (left-fold dots, 1e9-floored longs, long sums).
    */
  def ivfpq(s: SparkSession, d: String): DataFrame = {
    val withN = withNorms(s, d)
    val (assignment, probeCells) = ivfCells(withN)
    val cents = withN.join(broadcast(panel(withN, "cent:", CENT_COUNT)), "vec_id")
      .toDF("cell", "cv", "cnrm").drop("cnrm")
    val resid = withN.join(assignment, "vec_id").join(broadcast(cents), "cell")
      .select(col("vec_id"), col("cell"),
        // codegen residual instead of zip_with (round r14, guide §4): one
        // interpreted lambda per element over every corpus vector, and it
        // broke the projection out of whole-stage codegen
        graft.plans.ArraySub.sub(col("v"), col("cv")).as("rv"))
    // residual codebook: the ivfpq: panel's own residuals (fixed PQ_K size)
    val cb = resid.join(broadcast(panel(withN, "ivfpq:", PQ_K)), "vec_id")
      .select(col("vec_id").as("cent_id"), col("rv").as("cbv"))
    def subvec(v: Column, sub: Column) =
      slice(v, sub * PQ_SUBDIM + 1, lit(PQ_SUBDIM))
    val subs = explode(sequence(lit(0), lit(PQ_S - 1))).as("sub")
    val cpairs = resid.select(col("vec_id"), col("cell"), col("rv"), subs)
      .join(broadcast(cb), lit(true))
      .select(col("vec_id"), col("cell"), col("sub"), col("cent_id"),
        graft.plans.DotProduct.dot(subvec(col("rv"), col("sub")),
          subvec(col("cbv"), col("sub"))).as("subdot"))
    val bySub = Window.partitionBy(col("vec_id"), col("sub"))
      .orderBy(col("subdot").desc, col("cent_id"))
    val codes = cpairs.withColumn("crk", row_number().over(bySub))
      .filter(col("crk") === 1)
      .select(col("vec_id").as("neighbor_id"), col("cell"), col("sub"),
        col("cent_id").as("code"))
    // probe side: per probed cell, the coarse term and the residual LUT
    val probes = withN.join(broadcast(panel(withN, "probe:", PROBE_COUNT)), "vec_id")
      .select(col("vec_id").as("probe_id"), col("v").as("pv"))
    val pres = probes.join(broadcast(probeCells), "probe_id")
      .join(broadcast(cents), "cell")
      .select(col("probe_id"), col("cell"),
        graft.plans.ArraySub.sub(col("pv"), col("cv")).as("rp"),
        floor(graft.plans.DotProduct.dot(col("pv"), col("cv")) * 1e9)
          .cast("long").as("coarse"))
    val lut = pres.select(col("probe_id"), col("cell"), col("coarse"), col("rp"), subs)
      .join(broadcast(cb), lit(true))
      .select(col("probe_id"), col("cell"), col("coarse"), col("sub"),
        col("cent_id").as("code"),
        floor(graft.plans.DotProduct.dot(subvec(col("rp"), col("sub")),
          subvec(col("cbv"), col("sub"))) * 1e9).cast("long").as("pdot"))
    val scored = codes.join(broadcast(lut), Seq("cell", "sub", "code"))
      .filter(col("probe_id") =!= col("neighbor_id"))
      .groupBy(col("probe_id"), col("neighbor_id"))
      .agg((max(col("coarse")) + sum(col("pdot"))).as("iscore"))
    val shortlist = graft.plans.TopK.perKey(scored, Seq("probe_id"),
      Seq(col("iscore").desc, col("neighbor_id").asc), PQ_SHORTLIST)
      .select(col("probe_id"), col("neighbor_id"))
    val reranked = withN.select(col("vec_id").as("neighbor_id"), col("v").as("nv"))
      .join(broadcast(shortlist), Seq("neighbor_id"))
      .join(broadcast(probes), Seq("probe_id"))
      .select(col("probe_id"), col("neighbor_id"),
        graft.plans.DotProduct.dot(col("pv"), col("nv")).as("dot"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("dot").desc, col("neighbor_id"))
    reranked.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= CAND_TOPK)
      .select(col("probe_id"), col("rk"), col("neighbor_id"),
        graft.core.Determinism.r4(col("dot")).as("dot"))
      .orderBy("probe_id", "rk")
  }

  /** Recall@k gate for the composed IVF-PQ index — the coarse pruning and
    * the residual quantization each lose information; this measures the
    * two losses composed.
    */
  def recallEvalIvfPq(s: SparkSession, d: String): DataFrame =
    recallOf(s, d, ivfpq(s, d))

  /** Recall@k gate for the SQ8 index — fourth index, fourth shipped
    * recall measurement.
    */
  def recallEvalSq8(s: SparkSession, d: String): DataFrame =
    recallOf(s, d, sq8(s, d))

  // ---- incremental IVF maintenance: assign a new batch, never rebuild -----
  /** Fraction selector for the simulated "new arrivals" batch: a
    * deterministic ~20% of the corpus by salted hash.
    */
  private def isNewBatch: Column =
    md5Long(concat(lit("batch:"), col("vec_id"))) % 5 === 0

  /** Incremental IVF index maintenance — the production shape for a growing
    * corpus (the vector-store mirror of [[graft.queries.Dedup]]'s
    * dedup_incremental): the coarse codebook was trained when the index was
    * built (here: the cent: hash panel over the PRE-EXISTING vectors only),
    * and a newly arrived batch is assigned to those FROZEN centroids and
    * merged in — the corpus is never re-quantized. Old vectors keep their
    * cells bit-for-bit (spec-asserted against an old-only build): a full
    * rebuild would re-draw the codebook over old+new and reshuffle every
    * existing cell, invalidating cached cell lists and forcing a full
    * re-encode — O(batch) work instead becomes O(corpus).
    *
    * Scale shape: the codebook is a CENT_COUNT-row broadcast, so the merge
    * is ONE map pass over the batch (batch × K similarity + a per-vector
    * argmax window); the old index is read, not recomputed — at 100 TB the
    * incremental cost is proportional to the day's arrivals, not the
    * archive. Output is the merged assignment relation (vec_id, cell,
    * 4-dp similarity, old/new provenance).
    */
  def incrementalIvf(s: SparkSession, d: String): DataFrame =
    // the merged assignment is itself a stored-index relation (ids + cell
    // + r4 similarity + provenance — parquet-exact), rebuilt identically
    // by ann_incremental and ann_cell_drift: publish once, read twice
    graft.core.ArtifactCache.getOrBuild(s, "ivf_incremental_merged",
      s"v1 k=$CENT_COUNT", Seq(s"$d/embeddings.parquet")) {
      val withN = withNorms(s, d)
      val old = withN.filter(!isNewBatch)
      val batch = withN.filter(isNewBatch)
      val cents = old.join(broadcast(panel(old, "cent:", CENT_COUNT)), "vec_id")
        .toDF("cent_id", "cv", "cnrm")
      incrementalAssign(old, cents, "old")
        .unionByName(incrementalAssign(batch, cents, "new"))
    }.orderBy("vec_id")

  /** Nearest-frozen-centroid assignment of `df` (the ivfCells argmax against
    * an explicit centroid relation). Exposed for the spec's old-rows
    * byte-identity check.
    */
  private[graft] def incrementalAssign(df: DataFrame, cents: DataFrame,
                                       tag: String): DataFrame = {
    val sims = df.join(broadcast(cents), lit(true))
      .select(col("vec_id"), col("cent_id"),
        cosCols(graft.plans.DotProduct.dot(col("v"), col("cv")),
          col("nrm"), col("cnrm")).as("csim"))
    val byVec = Window.partitionBy(col("vec_id"))
      .orderBy(col("csim").desc, col("cent_id"))
    sims.withColumn("crk", row_number().over(byVec))
      .filter(col("crk") === 1)
      .select(col("vec_id"), col("cent_id").as("cell"),
        graft.core.Determinism.r4(col("csim")).as("csim"),
        lit(tag).as("src"))
  }

  /** The old-corpus-only index pieces (old vectors with norms, frozen
    * centroid relation) — exposed for the spec.
    */
  private[graft] def incrementalParts(s: SparkSession, d: String)
      : (DataFrame, DataFrame, DataFrame) = {
    val withN = withNorms(s, d)
    val old = withN.filter(!isNewBatch)
    val batch = withN.filter(isNewBatch)
    val cents = old.join(broadcast(panel(old, "cent:", CENT_COUNT)), "vec_id")
      .toDF("cent_id", "cv", "cnrm")
    (old, batch, cents)
  }

  /** Post-merge cell-occupancy audit — the ops signal that decides WHEN
    * "maintain, don't rebuild" stops being safe: per frozen-codebook cell,
    * old-index size vs arrivals absorbed, growth ratio, and a retrain
    * flag once a cell has grown ≥1.5× its build-time size (integer-exact
    * comparison, no float threshold). A vector store runs exactly this
    * audit to schedule re-quantization; the cost is one catalog-sized agg
    * over the merged assignment — CENT_COUNT output rows at any corpus
    * size.
    */
  def cellDrift(s: SparkSession, d: String): DataFrame = {
    val merged = incrementalIvf(s, d)
    merged.groupBy(col("cell")).agg(
        sum(when(col("src") === "old", 1L).otherwise(0L)).as("n_old"),
        sum(when(col("src") === "new", 1L).otherwise(0L)).as("n_new"))
      .select(col("cell"), col("n_old"), col("n_new"),
        graft.core.Determinism.r4(
          (col("n_old") + col("n_new")).cast("double") /
            greatest(col("n_old"), lit(1L)).cast("double")).as("growth"),
        (lit(2) * (col("n_old") + col("n_new")) >=
          lit(3) * greatest(col("n_old"), lit(1L))).cast("int").as("retrain_flag"))
      .orderBy("cell")
  }

  /** IVF search over the INCREMENTALLY maintained index: probed cells come
    * from the same FROZEN old-corpus codebook the merge assigns against,
    * and the scanned cell lists are the merged (old + new batch)
    * assignment. This is the query side of [[incrementalIvf]] — the same
    * plan shape as [[ivf]] (broadcast codebook, NPROBE-bounded scan), only
    * the quantizer provenance differs.
    */
  private def incrementalSearch(s: SparkSession, d: String): DataFrame = {
    val withN = withNorms(s, d)
    val old = withN.filter(!isNewBatch)
    val cents = old.join(broadcast(panel(old, "cent:", CENT_COUNT)), "vec_id")
      .toDF("cent_id", "cv", "cnrm")
    // every vector (old AND new) ranked against the frozen centroids: one
    // broadcast map pass feeding the merged assignment and the probe cells
    val sims = withN.join(broadcast(cents), lit(true))
      .select(col("vec_id"), col("cent_id"),
        cosCols(graft.plans.DotProduct.dot(col("v"), col("cv")),
          col("nrm"), col("cnrm")).as("csim"))
    val byVec = Window.partitionBy(col("vec_id"))
      .orderBy(col("csim").desc, col("cent_id"))
    val ranked = sims.withColumn("crk", row_number().over(byVec))
      .localCheckpoint()
    val assignment = ranked.filter(col("crk") === 1)
      .select(col("vec_id"), col("cent_id").as("cell"))
    val probeCells = ranked
      .join(broadcast(panel(withN, "probe:", PROBE_COUNT)), "vec_id")
      .filter(col("crk") <= NPROBE)
      .select(col("vec_id").as("probe_id"), col("cent_id").as("cell"))
    val corpus = withN.join(assignment, "vec_id")
      .toDF("neighbor_id", "cv2", "cnrm2", "cell")
    val probes = withN.toDF("probe_id", "pv", "pnrm")
      .join(probeCells, "probe_id")
    val cand = corpus.join(broadcast(probes), Seq("cell"))
      .filter(col("probe_id") =!= col("neighbor_id"))
      .select(col("probe_id"), col("neighbor_id"),
        cosCols(graft.plans.DotProduct.dot(col("pv"), col("cv2")),
          col("pnrm"), col("cnrm2")).as("cos"))
    rankTop(cand, CAND_TOPK)
  }

  /** Recall gate for the incrementally maintained index — the number that
    * certifies "maintain, don't rebuild" preserves search quality: the
    * merged index is searched exactly like a rebuilt one and compared to
    * the same exact ground truth as the other seven gates.
    */
  def recallEvalIncremental(s: SparkSession, d: String): DataFrame =
    recallOf(s, d, incrementalSearch(s, d))

  // ---- NN-descent: neighbor-of-neighbor graph refinement ------------------
  private val NND_SAMPLE = 8 // per-vertex degree cap on the symmetrized graph
  private[graft] val NND_ITERS = 3

  /** WORKING graph width during descent — deliberately wider than the
    * [[CAND_TOPK]] the consumers cut to at the end. With the working width
    * equal to the output k, tight clusters close into sub-ring islands:
    * every slot of a vertex's list fills with in-island siblings
    * (cos ≈ 1), the lower-cos exploration edges (hash-ring jumps that
    * reach OTHER islands of the same cluster) are pruned before the next
    * round can expand through them, and recall on a clustered corpus
    * ceilings (0.33 at sf0.1 with width 3 — the r8 "documented future
    * work" note). Real NN-Descent runs working K ≈ 20-50 for exactly this
    * reason. Width 12 (with [[NND_SAMPLE]] 8) measured: clustered recall
    * sf0.01 0.83→0.90, sf0.1 0.33→0.43, and the near-random stress corpus
    * roughly triples — at +1.6 s across the four NND-family bench
    * queries. The REMAINING sf0.1 gap (0.43 vs the 0.8 floor) was the
    * fixed seed's island closure, fixed in round 10 by per-round
    * RE-SEEDING (see [[nndGraphBuild]]): fresh-salted seed pairs each
    * round bridge the sub-ring islands, measured 0.97/0.90/0.87 clustered
    * recall by sf at 3 rounds — the 0.8 floor now binds at every scale
    * including the 5120-vector bench corpus. Output semantics are
    * unchanged in SHAPE (consumers cut to [[CAND_TOPK]]) and improve in
    * VALUE wherever the wider descent finds closer neighbors; the DuckDB
    * twin tracks through the shared constants and salts.
    */
  private[graft] val NND_WORKK = 12

  /** NN-descent over a corpus-wide k-NN graph — the graph-refinement idiom
    * behind every graph ANN index build (NN-Descent / k-NN-graph
    * construction: "a neighbor of a neighbor is likely a neighbor"). Each
    * of the [[NND_ITERS]] iterations symmetrizes the current graph, caps
    * each vertex's sample at [[NND_SAMPLE]] edges (the ρK sampling every
    * production NN-Descent applies — without it hub vertices make the
    * two-hop join quadratic in their reverse degree), expands
    * neighbor-of-neighbor candidates with one self-join, exactly rescores
    * candidate pairs, and keeps the refined top-k per vertex.
    *
    * The seed graph unions TWO independent bucketings — the LSH cells (a
    * quality seed) and a geometry-blind md5 hash ring (an exploration
    * seed). One bucketing alone CANNOT work: a bucket partition is closed
    * under the two-hop expansion (a neighbor's neighbors sit in the same
    * bucket, already scored when the seed was built), so descent would
    * converge instantly to the seed itself — measured, not guessed: the
    * single-seed variant moved zero edges in round one. With two
    * partitions a two-hop path crosses them and each round reaches
    * genuinely new pairs (the spec asserts graph quality climbs every
    * round).
    *
    * Scale shape: the graph relation is N·k rows (ids + one double — never
    * vectors), each two-hop join is bounded at N·[[NND_SAMPLE]]² candidate
    * pairs, and only candidates are ever exactly scored (corpus vectors are
    * hash-joined to the candidate list by id; the corpus itself is never
    * self-joined). Both seed bucketings hold ~8 vectors per cell at any
    * corpus size — the exploration ring by construction (cell count scales
    * with N), the LSH side because its fixed 64 cells are sub-divided by a
    * second hash ring (without that, in-cell pairs would grow as N²/64) —
    * so the seed build is linear; cell counts derive from the same corpus
    * count in both engines. Every stage is deterministic: cosines fold
    * left-to-right, ties break on vertex id.
    */
  def nndescent(s: SparkSession, d: String): DataFrame =
    rankTop(nndGraph(s, d, NND_ITERS)
      .select(col("src").as("probe_id"), col("dst").as("neighbor_id"),
        col("cos")), CAND_TOPK)

  /** The refined (src, dst, cos) graph after `iters` NN-descent rounds —
    * exposed separately so the spec can measure the recall trajectory.
    *
    * Build-once/query-many: the descent is deterministic, so the graph is
    * published through [[graft.core.ArtifactCache]] and the four consumers
    * (nndescent / recall_nnd / graph_search / recall_gsearch) share ONE
    * materialized build per (corpus, iters) instead of each re-running the
    * 3-round descent — the amortized-build contract of every graph ANN
    * index. Values are identical either way (asserted by the oracle gate);
    * Bench's nndescent scale probe bypasses the cache because it measures
    * the BUILD's scaling.
    */
  private[graft] def nndGraph(s: SparkSession, d: String, iters: Int): DataFrame =
    graft.core.ArtifactCache.getOrBuild(s, "nnd_graph",
      s"v3 iters=$iters sample=$NND_SAMPLE workk=$NND_WORKK k=$CAND_TOPK reseed",
      Seq(s"$d/embeddings.parquet")) { nndGraphBuild(s, d, iters) }

  /** The deduped (u, w) seed candidate pairs of the NND build — the
    * cardinality the composite (LSH cell ⊗ sub-ring) seed bounds at ~N·8
    * where raw fixed-count LSH cells would grow N²/64. Exposed so the
    * bench scale probe can count it noise-free: a count ratio ≈ the data
    * factor certifies the linear seed empirically.
    */
  private[graft] def nndSeedPairs(s: SparkSession, d: String): DataFrame =
    nndSeedPairsOf(vecs(s, d))

  /** Candidate pairs from the dual bucketing. `salt` varies the hash draws
    * (empty = the round-0 seed): each descent round re-seeds with a fresh
    * salt, which re-partitions every LSH cell into DIFFERENT ~8-vector
    * islands — the bridge edges that break the island closure the fixed
    * seed creates (see [[nndGraphBuild]]).
    */
  private def nndSeedPairsOf(all: DataFrame, salt: String = ""): DataFrame = {
    // dual seed: LSH cells + an ~8-per-cell hash ring (cell counts derived
    // from the corpus count — a one-row broadcast, not a collect). The LSH
    // cells are themselves SUB-DIVIDED by a second hash ring: the plane
    // count is fixed (64 cells), so raw cells hold N/64 vectors and
    // in-cell pair generation would grow quadratically with the corpus —
    // the composite (cell, sub-ring) key caps expected occupancy at ~8 at
    // any N (R = 1 below 512 vectors, so small fixtures are unaffected).
    val ncnt = all.agg(count(lit(1)).as("n"))
    val withN2 = all.select(col("vec_id")).crossJoin(broadcast(ncnt))
    val ring = withN2
      .select(col("vec_id"), (lit(-1L) -
        md5Long(concat(lit(s"nnd:$salt"), col("vec_id")))
          % ceil(col("n") / 8.0).cast("long")).as("bucket"))
    val subR = ceil(col("n") / 512.0).cast("long")
    val lshSub = bucketsOf(all).crossJoin(broadcast(ncnt))
      .select(col("vec_id"), (col("bucket") * subR +
        md5Long(concat(lit(s"nnd2:$salt"), col("vec_id"))) % subR).as("bucket"))
    val seeds = lshSub.unionByName(ring)
    val a = seeds.toDF("src", "bucket")
    val b = seeds.toDF("dst", "bucket")
    // a pair sharing both cells would otherwise be scored twice
    a.join(b, Seq("bucket")).filter(col("src") =!= col("dst"))
      .select(col("src").as("u"), col("dst").as("w")).distinct()
  }

  private def nndGraphBuild(s: SparkSession, d: String, iters: Int): DataFrame = {
    val all = vecs(s, d)
    val norms = all.select(col("vec_id"),
      graft.plans.DotProduct.dot(col("v"), col("v")).as("nrm"))
    // zero-norm guard as in the embedding dedup: cos would be NaN
    val ok = all.join(norms, "vec_id").filter(col("nrm") > 0)
    val cu = ok.toDF("u", "pv", "pn").localCheckpoint()
    val cw = cu.toDF("w", "cv", "cn")
    val seedPairs = nndSeedPairsOf(all)
    val seedScored = seedPairs.join(cu, "u").join(cw, "w")
      .select(col("u").as("src"), col("w").as("dst"), cosCols(
        graft.plans.DotProduct.dot(col("pv"), col("cv")),
        col("pn"), col("cn")).as("cos"))
    // each round references the graph four times — truncate lineage per hop
    var graph = graft.plans.TopK.perKey(seedScored, Seq("src"),
        Seq(col("cos").desc, col("dst").asc), NND_WORKK)
      .select("src", "dst", "cos")
      .localCheckpoint()
    for (t <- 1 to iters) {
      val und = graph.unionByName(graph.select(col("dst").as("src"),
          col("src").as("dst"), col("cos")))
        .distinct() // a pair present in both directions carries the same cos
      val undCap = graft.plans.TopK.perKey(und, Seq("src"),
          Seq(col("cos").desc, col("dst").asc), NND_SAMPLE)
        .select("src", "dst")
      val hop2 = undCap.toDF("u", "mid").join(undCap.toDF("mid", "w"), Seq("mid"))
        .filter(col("u") =!= col("w"))
        .select(col("u"), col("w"))
      // per-round RE-SEED (fresh salt): the round-0 seed partitions each
      // LSH cell into fixed sub-ring islands, and on a tight cluster every
      // working slot fills with in-island siblings — two-hop expansion can
      // then never reach the OTHER islands of the same sibling set (the
      // r9 0.43 recall ceiling on the sf0.1 clustered corpus). A fresh
      // salt per round re-partitions every cell differently, so each
      // round exactly scores ~8 new same-cell candidates per vertex and
      // the high-cos survivors bridge the islands for the next round's
      // two-hop. Still linear: +N·~16 scored pairs per round, same as the
      // seed itself.
      val fresh = nndSeedPairsOf(all, s"r$t:")
      val cand = hop2.unionByName(graph.select(col("src").as("u"),
          col("dst").as("w"))).unionByName(fresh).distinct()
      val rescored = cand.join(cu, "u").join(cw, "w")
        .select(col("u").as("src"), col("w").as("dst"), cosCols(
          graft.plans.DotProduct.dot(col("pv"), col("cv")),
          col("pn"), col("cn")).as("cos"))
      graph = graft.plans.TopK.perKey(rescored, Seq("src"),
          Seq(col("cos").desc, col("dst").asc), NND_WORKK)
        .select("src", "dst", "cos")
        .localCheckpoint()
    }
    graph
  }

  /** Recall@k gate for the refined graph, evaluated on the probe panel —
    * one NN-descent iteration must recover more of the exact top-k than the
    * bucket-local base graph alone (spec-asserted).
    */
  def recallEvalNnd(s: SparkSession, d: String): DataFrame =
    recallOf(s, d, nndescent(s, d))

  // ---- greedy beam search over the refined k-NN graph ---------------------
  private[graft] val GS_ENTRIES = 4 // fixed entry-point panel
  private[graft] val GS_BEAM = 4    // beam width
  private[graft] val GS_HOPS = 3    // unrolled expansion rounds

  /** Greedy beam search over the NN-descent graph — the query-time idiom of
    * every graph ANN index (HNSW/NSG: hop from fixed entry points toward
    * the probe, keeping a best-so-far pool). Entry points are a fixed
    * salted-hash panel ([[GS_ENTRIES]] vertices); each of the [[GS_HOPS]]
    * rounds takes the pool's top-[[GS_BEAM]] per probe, walks one hop on
    * the symmetrized graph, exactly scores only the NOT-yet-visited
    * candidates (the visited-set anti-join every implementation keeps),
    * and merges them into the pool. Output is the pool's final top-k.
    *
    * Scale shape: the search never scans the corpus — per probe it touches
    * ≤ [[GS_BEAM]]·deg new vertices per hop, joined to the graph relation
    * by id; the probe panel and entry panel are constant-size broadcasts.
    * At 100 TB the graph relation is the only large input and it is
    * id-keyed (the HNSW trade: build cost amortized into a reusable
    * navigable structure, per-query cost independent of N).
    */
  def graphSearch(s: SparkSession, d: String): DataFrame = {
    val all = vecs(s, d)
    val norms = all.select(col("vec_id"),
      graft.plans.DotProduct.dot(col("v"), col("v")).as("nrm"))
    val withN = all.join(norms, "vec_id")
    val ok = withN.filter(col("nrm") > 0)
    val g = nndGraph(s, d, NND_ITERS)
    val und = g.select("src", "dst")
      .unionByName(g.select(col("dst").as("src"), col("src").as("dst")))
      .distinct().localCheckpoint()
    // panels select over the UNFILTERED corpus (the family's convention —
    // keeps the salted-hash panel identical to every other ann_* query)
    val probes = withN.join(broadcast(panel(all, "probe:", PROBE_COUNT)), "vec_id")
      .toDF("probe_id", "pv", "pn").localCheckpoint()
    val entries = all.select(col("vec_id"))
      .join(broadcast(panel(all, "entry:", GS_ENTRIES)), "vec_id")
      .select(col("vec_id").as("cand"))
    val corpus = ok.toDF("cand", "cv", "cn")
    // scores (probe, cand) pairs; drops the probe itself (cos 1 with itself).
    // The FRONTIER side broadcasts explicitly (round r14, guide §3.1 /
    // r13 VERDICT #4): pc is ≤ probes·beam·deg rows but flows out of a
    // localCheckpoint, whose LogicalRDD carries no size statistics — the
    // planner assumed it huge and SORT-MERGE-joined, shuffling the CORPUS
    // by cand on every hop. With the hint the corpus never shuffles: the
    // search's whole 100 TB claim ("per probe touches ≤ beam·deg vertices,
    // joined to the corpus by id") is now the plan's shape too.
    def scoredPairs(pc: DataFrame): DataFrame = broadcast(pc)
      .join(corpus, "cand")
      .join(broadcast(probes), "probe_id")
      .filter(col("cand") =!= col("probe_id"))
      .select(col("probe_id"), col("cand"), cosCols(
        graft.plans.DotProduct.dot(col("pv"), col("cv")),
        col("pn"), col("cn")).as("cos"))
    var visited = scoredPairs(
        entries.crossJoin(broadcast(probes.select("probe_id"))))
      .localCheckpoint()
    for (_ <- 1 to GS_HOPS) {
      val beam = graft.plans.TopK.perKey(visited, Seq("probe_id"),
          Seq(col("cos").desc, col("cand").asc), GS_BEAM)
        .select("probe_id", "cand")
      // beam (≤ probes·beam rows) broadcasts against the graph relation —
      // the id-keyed hop join the scaladoc promises; same no-stats cause
      val nbrs = broadcast(beam).join(und.toDF("cand", "nxt"), "cand")
        .select(col("probe_id"), col("nxt").as("cand")).distinct()
      // the visited-set anti-join: visited is probes·pool-sized (ids only)
      // — broadcast the build side instead of shuffling both
      val fresh = nbrs.join(broadcast(visited.select("probe_id", "cand")),
        Seq("probe_id", "cand"), "left_anti")
      visited = visited.unionByName(scoredPairs(fresh)).localCheckpoint()
    }
    rankTop(visited.select(col("probe_id"),
      col("cand").as("neighbor_id"), col("cos")), CAND_TOPK)
  }

  /** Recall@k gate for the graph search — bounded above by the graph's own
    * quality ([[recallEvalNnd]]): search can only find what the navigable
    * structure reaches.
    */
  def recallEvalGsearch(s: SparkSession, d: String): DataFrame =
    recallOf(s, d, graphSearch(s, d))

  /** Recall@k evaluation: per probe, how many of the exact top-k (from the
    * brute-force pass) the LSH index recovered — the quality gauge every
    * approximate index needs shipped alongside it ("measure, don't guess").
    */
  def recallEval(s: SparkSession, d: String): DataFrame =
    recallOf(s, d, lsh(s, d))

  /** Recall@k gate for the IVF index — every approximate index ships with
    * its own measured recall, not just the LSH one.
    */
  def recallEvalIvf(s: SparkSession, d: String): DataFrame =
    recallOf(s, d, ivf(s, d))

  /** Recall@k gate for the PQ index — the third index ships with its own
    * measured recall too (ADC quantization error is exactly what this
    * catches: the shortlist+rerank must keep true neighbors in reach).
    */
  def recallEvalPq(s: SparkSession, d: String): DataFrame =
    recallOf(s, d, pq(s, d))

  /** Single-probe recall — kept for the spec's strict-improvement gate. */
  private[graft] def recallEvalSingleProbe(s: SparkSession, d: String): DataFrame =
    recallOf(s, d, lshImpl(s, d, multiprobe = false))

  /** The exact top-k ground truth all seven recall gates compare against —
    * one brute-force probe×corpus pass, identical across gates, so it is
    * published once through [[graft.core.ArtifactCache]] like the NND
    * graph (build-once/query-many; the relation is ids only, so the
    * parquet round trip is trivially exact). Before this, each recall
    * gate re-ran the same exact pass — 7× the suite's single most
    * redundant computation.
    */
  private def groundTruth(s: SparkSession, d: String): DataFrame =
    graft.core.ArtifactCache.getOrBuild(s, "ann_ground_truth",
      s"v1 k=$CAND_TOPK probes=$PROBE_COUNT",
      Seq(s"$d/embeddings.parquet")) {
      bruteforce(s, d).filter(col("rk") <= CAND_TOPK)
        .select(col("probe_id"), col("neighbor_id"))
    }

  private def recallOf(s: SparkSession, d: String, lshDf: DataFrame): DataFrame = {
    val bf = groundTruth(s, d)
    val ls = lshDf
      .select(col("probe_id").as("l_probe"), col("neighbor_id").as("l_neighbor"))
    bf.join(ls, bf("probe_id") === ls("l_probe")
        && bf("neighbor_id") === ls("l_neighbor"), "left")
      .groupBy(col("probe_id"))
      .agg(count(col("l_neighbor")).as("n_match"))
      .select(col("probe_id"), col("n_match"),
        graft.core.Determinism.r4(col("n_match").cast("double") / CAND_TOPK)
          .as("recall"))
      .orderBy("probe_id")
  }

  // ---- clustered fixture: recall gates that DISCRIMINATE -----------------
  /** The synthetic embedding corpus is near-random, so the NND/IVFPQ recall
    * gates sit at 0.03–0.13 there — honest, but verifying plumbing more
    * than search quality (descent has no cluster structure to exploit, and
    * ADC has no scale separation to resolve). This fixture derives a
    * TWO-LEVEL clustered corpus from the same table: [[CL_K]] salted-panel
    * centers, every vec_id hash-assigned to a center AND to one of
    * [[CL_SC]] GLOBAL sub-offsets (the same [[CL_SC]] offset vectors in
    * every cluster — so the residual space after coarse quantization has
    * ~[[CL_SC]] distinct patterns, representable by a [[PQ_K]]-entry
    * codebook), plus per-vector noise two orders below the sub-offset
    * scale. True top-k = sub-cluster siblings, separated from the rest of
    * the cluster at the ±[[CL_SUB]]/2 scale ADC can resolve, while sibling
    * ranking sits at the ±[[CL_NOISE]]/2 scale only the exact rerank sees
    * — exactly the structure a correct IVF-PQ exploits. On it the
    * NND and IVF-PQ gates must reach recall@k ≥ 0.8 (AnnTextSpec pins the
    * floors); the hard near-random corpus stays as the documented stress
    * fixture. The derivation is bit-deterministic in both engines (same
    * md5-derived offsets, same double arithmetic), so the clustered gates
    * are oracle-checked like every other query.
    *
    * Measured (avg recall@3, working width [[NND_WORKK]]=12 + per-round
    * re-seed): clustered sf0.001 NND 0.97 / IVF-PQ 0.93; sf0.01 NND
    * 0.90 / IVF-PQ 0.87; sf0.1 NND 0.87 / IVF-PQ 1.00. The r8 verdict's
    * 0.33 ceiling was the working-width-3 sub-ring island closure
    * (widening to 12 lifted every corpus); the r9 verdict's remaining
    * 0.43 sf0.1 gap was the FIXED seed's island closure — per-round
    * re-seeding ([[nndGraphBuild]]) bridges the islands and the 0.8
    * floor now binds at all three scales (AnnTextSpec pins sf0.001 and
    * the 5120-vector sf0.1 corpus explicitly; trajectory via
    * [[nndRecallAt]] / tools.NndTune: sf0.1 climbs 0.30 → 0.53 → 0.87
    * over the three rounds, 1.00 by round 5).
    */
  private[graft] val CL_K = 16
  private[graft] val CL_SC = 8
  private[graft] val CL_SUB = 0.4
  private[graft] val CL_NOISE = 0.02

  /** Stage the clustered corpus as a parquet dir shaped like testdata
    * (`<out>/embeddings.parquet`), so every ANN operator runs on it
    * UNCHANGED by passing this dir as `d` — one fixture, the whole family.
    * Written once per source dir; the write is a distributed broadcast
    * join (centers are CL_K rows), not a driver-side loop.
    */
  private[graft] def clusteredDir(s: SparkSession, d: String): String = {
    // parameters in the path: a derivation change can never serve stale data
    val out = s"/tmp/graft_clustered/${java.lang.Integer.toHexString(d.hashCode)}" +
      s"-k$CL_K-s$CL_SC-b$CL_SUB-n$CL_NOISE-u1"
    if (!new java.io.File(s"$out/embeddings.parquet/_SUCCESS").exists()) {
      val base = vecs(s, d)
      val w = Window.orderBy(col("h"), col("vec_id")) // CL_K rows post-limit
      val cents = base
        .select(col("vec_id"), col("v"),
          md5Long(concat(lit("clcent:"), col("vec_id"))).as("h"))
        .orderBy(col("h"), col("vec_id")).limit(CL_K)
        .withColumn("cidx", row_number().over(w) - 1)
        .select(col("cidx"), col("v").as("cv"))
      val assigned = base.select(col("vec_id"),
        (md5Long(concat(lit("clmem:"), col("vec_id"))) % CL_K).as("cidx"),
        (md5Long(concat(lit("clsc:"), col("vec_id"))) % CL_SC).as("sc"))
      val raw = assigned.join(broadcast(cents), "cidx")
        .select(col("vec_id"),
          transform(col("cv"), (e, i) => e +
            ((md5Long(concat(lit("clsub:"), col("sc"), lit(":"), i)) % 1000)
              .cast("double") / 1000.0 - 0.5) * CL_SUB +
            ((md5Long(concat(lit("clp:"), col("vec_id"), lit(":"), i)) % 1000)
              .cast("double") / 1000.0 - 0.5) * CL_NOISE).as("v"))
      // unit-normalize: cluster CENTER norms vary, and the PQ family ranks
      // by raw inner product while the recall ground truth is cosine — on
      // unit vectors the two orders coincide, so the gate measures index
      // quality, not the norm confound
      raw.select(col("vec_id"),
          sqrt(graft.plans.DotProduct.dot(col("v"), col("v"))).as("nrm"),
          col("v"))
        .select(col("vec_id"),
          transform(col("v"), e => e / col("nrm")).as("embedding"))
        .write.mode("overwrite").parquet(s"$out/embeddings.parquet")
    }
    out
  }

  /** NND recall gate on the clustered corpus — floor 0.8, spec-pinned. */
  def recallEvalNndClustered(s: SparkSession, d: String): DataFrame =
    recallEvalNnd(s, clusteredDir(s, d))

  /** Average NND recall after `iters` rounds — trajectory probe for specs
    * and tuning (dir passed verbatim; pair with [[clusteredDir]] to probe
    * the clustered fixture).
    */
  private[graft] def nndRecallAt(s: SparkSession, d: String, iters: Int): Double =
    recallOf(s, d, rankTop(nndGraph(s, d, iters)
        .select(col("src").as("probe_id"), col("dst").as("neighbor_id"),
          col("cos")), CAND_TOPK))
      .agg(avg(col("recall"))).collect().head.getDouble(0)

  /** IVF-PQ recall gate on the clustered corpus — floor 0.8, spec-pinned. */
  def recallEvalIvfPqClustered(s: SparkSession, d: String): DataFrame =
    recallEvalIvfPq(s, clusteredDir(s, d))

  /** One distributed Lloyd (k-means) update over the IVF codebook: every
    * vector is assigned to its nearest centroid (the exact ivfCells coarse
    * assignment), then the step emits the per-(cell, dim) sufficient
    * statistics (Σx as 6-dp-floored DECIMAL sum, member count) — what every
    * distributed k-means computes per iteration; the driver-side divide
    * that yields the new centroid coordinate is deferred, which keeps the
    * output engine-exact (no cross-engine double division) AND mirrors how
    * a real implementation ships partial aggregates to the reducer.
    * Codebook stays CENT_COUNT at any corpus size, so the output is a
    * constant K·dims rows and each iteration is one N·K map pass plus one
    * partially-aggregated shuffle of (cell, dim) keys.
    */
  def kmeansStep(s: SparkSession, d: String): DataFrame = {
    val withN = withNorms(s, d)
    val (assignment, _) = ivfCells(withN)
    val elems = vecs(s, d)
      .select(col("vec_id"), posexplode(col("v")).as(Seq("dim", "x")))
    elems.join(assignment, "vec_id")
      .groupBy(col("cell"), col("dim"))
      .agg(count(lit(1)).as("n_members"),
        graft.core.Determinism.dsum(
          graft.core.Determinism.r6(col("x"))).as("sum_val"))
      .orderBy("cell", "dim")
  }

  /** One distributed Lloyd update over the PQ codebook — [[kmeansStep]]'s
    * subspace twin, closing the PQ training loop: every (vector, subspace)
    * is assigned to its best codebook entry (exactly the [[pqCodes]]
    * encode), then the step emits per (sub, code, subdim) sufficient
    * statistics — member count and the 6-dp-floored DECIMAL coordinate sum
    * — deferring the divide, like [[kmeansStep]], to stay engine-exact.
    * Real PQ training alternates exactly this assign/update at billion
    * scale: the assignment is one map pass against the broadcast codebook,
    * the update one partially-aggregated shuffle keyed by (sub, code,
    * subdim) — PQ_S·PQ_K·PQ_SUBDIM = 1024 output rows at any corpus size.
    */
  def pqTrain(s: SparkSession, d: String): DataFrame = {
    val withN = withNorms(s, d)
    val codes = pqCodes(withN)
      .select(col("neighbor_id").as("vec_id"), col("sub"), col("code"))
    val subElems = vecs(s, d)
      .select(col("vec_id"), posexplode(col("v")).as(Seq("dim", "x")))
      .select(col("vec_id"),
        floor(col("dim") / PQ_SUBDIM).cast("int").as("sub"),
        (col("dim") % PQ_SUBDIM).as("subdim"), col("x"))
    subElems.join(codes, Seq("vec_id", "sub"))
      .groupBy(col("sub"), col("code"), col("subdim"))
      .agg(count(lit(1)).as("n_members"),
        graft.core.Determinism.dsum(
          graft.core.Determinism.r6(col("x"))).as("sum_val"))
      .orderBy("sub", "code", "subdim")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ann_pq_train"   -> (pqTrain _),
    "ann_range_search" -> (rangeSearch _),
    "ann_filter_search" -> (filterSearch _),
    "ann_kmeans_step" -> (kmeansStep _),
    "ann_bruteforce" -> (bruteforce _),
    "ann_lsh"        -> (lsh _),
    "ann_ivf"        -> (ivf _),
    "ann_incremental" -> (incrementalIvf _),
    "ann_cell_drift" -> (cellDrift _),
    "ann_pq"         -> (pq _),
    "ann_ivfpq"      -> (ivfpq _),
    "ann_recall_ivfpq" -> (recallEvalIvfPq _),
    "ann_nndescent"  -> (nndescent _),
    "ann_recall_nnd" -> (recallEvalNnd _),
    "ann_graph_search" -> (graphSearch _),
    "ann_recall_gsearch" -> (recallEvalGsearch _),
    "ann_sq8"        -> (sq8 _),
    "ann_recall_sq8" -> (recallEvalSq8 _),
    "ann_recall"     -> (recallEval _),
    "ann_recall_ivf" -> (recallEvalIvf _),
    "ann_recall_pq"  -> (recallEvalPq _),
    "ann_recall_incremental" -> (recallEvalIncremental _),
    "ann_recall_nnd_clustered" -> (recallEvalNndClustered _),
    "ann_recall_ivfpq_clustered" -> (recallEvalIvfPqClustered _)
  )

  private val vecsSql =
    "vecs AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)"

  /** SQL twin of [[clusteredDir]]'s derivation, binding the `vecs` CTE name
    * to the CLUSTERED corpus so every downstream chain (elems, norms,
    * buckets, nnd, ivfpq...) runs on it verbatim. DuckDB lambda indexes
    * are 1-based (Spark's transform is 0-based), hence the `i - 1`.
    */
  private def clusteredVecsSql =
    s"""vecs0 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       cl_ids AS (SELECT vec_id,
           row_number() OVER (ORDER BY ${md5LongSql("concat('clcent:', vec_id)")}, vec_id) - 1 AS cidx
         FROM vecs0
         QUALIFY cidx < $CL_K),
       cl_cents AS (SELECT c.cidx, v0.v AS cv
         FROM cl_ids c JOIN vecs0 v0 ON v0.vec_id = c.vec_id),
       cl_mem AS (SELECT vec_id,
           ${md5LongSql("concat('clmem:', vec_id)")} % $CL_K AS cidx,
           ${md5LongSql("concat('clsc:', vec_id)")} % $CL_SC AS sc
         FROM vecs0),
       cl_raw AS (SELECT x.vec_id,
           list_transform(cc.cv, (e, i) -> e +
             (CAST(${md5LongSql("concat('clsub:', m.sc, ':', i - 1)")} % 1000 AS DOUBLE)
                / 1000.0 - 0.5) * $CL_SUB +
             (CAST(${md5LongSql("concat('clp:', x.vec_id, ':', i - 1)")} % 1000 AS DOUBLE)
                / 1000.0 - 0.5) * $CL_NOISE) AS v
         FROM vecs0 x
         JOIN cl_mem m ON m.vec_id = x.vec_id
         JOIN cl_cents cc ON cc.cidx = m.cidx),
       vecs AS (SELECT vec_id,
           list_transform(v, e -> e / sqrt(${Dedup.dotSeqSql("v", "v")})) AS v
         FROM cl_raw)"""
  private val elemsSql =
    """elems AS (SELECT vec_id, unnest(v) AS x,
                 generate_subscripts(v, 1) AS i FROM vecs)"""
  private def normsSql =
    s"""norms AS (SELECT vec_id, ${Dedup.dotSeqSql("v", "v")} AS nrm FROM vecs)"""

  /** SQL twins of [[panel]]: fixed-count smallest-salted-hash selection. */
  private def probeIdsSql =
    s"""probe_ids AS (SELECT vec_id FROM vecs
       ORDER BY ${md5LongSql("concat('probe:', vec_id)")}, vec_id LIMIT $PROBE_COUNT)"""
  private def centIdsSql =
    s"""cent_ids AS (SELECT vec_id FROM vecs
       ORDER BY ${md5LongSql("concat('cent:', vec_id)")}, vec_id LIMIT $CENT_COUNT)"""

  /** SQL twin of the hamming-1 multiprobe expansion: probe rows fan out to
    * their own bucket plus each single-bit flip.
    */
  private def probeBucketsSql: String = {
    val flips = ("bucket" +: (0 until PLANES).map(i => s"xor(bucket, ${1L << i})"))
      .mkString("[", ", ", "]")
    s"""probe_buckets AS (SELECT vec_id, unnest($flips) AS bucket
       FROM buckets WHERE vec_id IN (SELECT vec_id FROM probe_ids))"""
  }

  /** SQL twin of [[buckets]] over an `elems(vec_id, x, i)` CTE — shared with
    * Dedup's LSH-blocked embedding pass.
    */
  private[queries] def bucketsSqlFragment: String =
    s"""planes AS (SELECT p, d,
         CAST((${md5LongSql("concat('pl:', p, ':', d)")} & 1) * 2 - 1 AS DOUBLE) AS comp
       FROM range(0, $PLANES) t1(p), range(0, 64) t2(d)),
     pdots AS (SELECT e.vec_id, pl.p,
         sum(CAST(floor(e.x * pl.comp * 1000000000.0) AS BIGINT)) AS pdot
       FROM elems e JOIN planes pl ON pl.d = e.i - 1
       GROUP BY 1, 2),
     buckets AS (SELECT vec_id,
         sum(CASE WHEN pdot > 0 THEN (CAST(1 AS BIGINT) << CAST(p AS INTEGER))
                  ELSE 0 END) AS bucket
       FROM pdots GROUP BY vec_id)"""

  /** SQL twin of the PQ pipeline (codebook → codes → LUT → ADC sum). */
  private def pqSql: String = {
    def sl(v: String) = s"array_slice($v, sp.sub * $PQ_SUBDIM + 1, sp.sub * $PQ_SUBDIM + $PQ_SUBDIM)"
    s"""pq_ids AS (SELECT vec_id FROM vecs
         ORDER BY ${md5LongSql("concat('pq:', vec_id)")}, vec_id LIMIT $PQ_K),
       cents AS (SELECT vec_id AS cent_id, v AS cv FROM vecs
         WHERE vec_id IN (SELECT vec_id FROM pq_ids)),
       subspaces AS (SELECT CAST(s AS INTEGER) AS sub FROM range(0, $PQ_S) t(s)),
       pairs AS (SELECT x.vec_id, sp.sub, c.cent_id,
           ${Dedup.dotSeqSql(s"${sl("x.v")}", s"${sl("c.cv")}")} AS subdot
         FROM vecs x, subspaces sp, cents c),
       codes AS (SELECT vec_id AS neighbor_id, sub, cent_id AS code
         FROM (SELECT vec_id, sub, cent_id,
                 row_number() OVER (PARTITION BY vec_id, sub
                                    ORDER BY subdot DESC, cent_id) AS crk
               FROM pairs) WHERE crk = 1),
       lut AS (SELECT p.vec_id AS probe_id, sp.sub, c.cent_id AS code,
           CAST(floor(${Dedup.dotSeqSql(s"${sl("p.v")}", s"${sl("c.cv")}")}
                * 1000000000.0) AS BIGINT) AS pdot
         FROM vecs p, subspaces sp, cents c
         WHERE p.vec_id IN (SELECT vec_id FROM probe_ids)),
       adc AS (SELECT l.probe_id, c.neighbor_id,
           CAST(sum(l.pdot) AS BIGINT) AS iscore
         FROM codes c JOIN lut l ON l.sub = c.sub AND l.code = c.code
         WHERE l.probe_id <> c.neighbor_id
         GROUP BY 1, 2),
       shortlist AS (SELECT probe_id, neighbor_id
         FROM (SELECT probe_id, neighbor_id,
                 row_number() OVER (PARTITION BY probe_id
                                    ORDER BY iscore DESC, neighbor_id) AS srk
               FROM adc) WHERE srk <= $PQ_SHORTLIST),
       reranked AS (SELECT s.probe_id, s.neighbor_id,
           ${Dedup.dotSeqSql("pv.v", "nv.v")} AS dot
         FROM shortlist s
         JOIN vecs pv ON pv.vec_id = s.probe_id
         JOIN vecs nv ON nv.vec_id = s.neighbor_id),
       pq_ranked AS (SELECT probe_id, neighbor_id, dot,
           row_number() OVER (PARTITION BY probe_id
                              ORDER BY dot DESC, neighbor_id) AS rk
         FROM reranked)"""
  }

  /** SQL twin of the IVF-PQ pipeline (probed cells → residuals → residual
    * codebook → codes → coarse+LUT → ADC → shortlist → exact rerank).
    * Assumes vecs/norms/probe_ids/cent_ids + the ivfAssignSql chain
    * (cents, ranked, assignment) are already in scope.
    */
  private def ivfpqSql: String = {
    def sl(v: String) = s"array_slice($v, sp.sub * $PQ_SUBDIM + 1, sp.sub * $PQ_SUBDIM + $PQ_SUBDIM)"
    s"""probe_cells AS (SELECT vec_id AS probe_id, cent_id AS cell
         FROM ranked WHERE vec_id IN (SELECT vec_id FROM probe_ids)
           AND crk <= $NPROBE),
       ipq_ids AS (SELECT vec_id FROM vecs
         ORDER BY ${md5LongSql("concat('ivfpq:', vec_id)")}, vec_id LIMIT $PQ_K),
       resid AS (SELECT x.vec_id, a.cell,
           list_transform(x.v, (e, i) -> e - cc.cv[i]) AS rv
         FROM vecs x
         JOIN assignment a ON a.vec_id = x.vec_id
         JOIN cents cc ON cc.cent_id = a.cell),
       cb AS (SELECT vec_id AS cent_id, rv AS cbv FROM resid
         WHERE vec_id IN (SELECT vec_id FROM ipq_ids)),
       subspaces AS (SELECT CAST(s AS INTEGER) AS sub FROM range(0, $PQ_S) t(s)),
       cpairs AS (SELECT r.vec_id, r.cell, sp.sub, c.cent_id,
           ${Dedup.dotSeqSql(sl("r.rv"), sl("c.cbv"))} AS subdot
         FROM resid r, subspaces sp, cb c),
       codes AS (SELECT vec_id AS neighbor_id, cell, sub, cent_id AS code
         FROM (SELECT vec_id, cell, sub, cent_id,
                 row_number() OVER (PARTITION BY vec_id, sub
                                    ORDER BY subdot DESC, cent_id) AS crk
               FROM cpairs) WHERE crk = 1),
       pres AS (SELECT pc.probe_id, pc.cell,
           list_transform(p.v, (e, i) -> e - cc.cv[i]) AS rp,
           CAST(floor(${Dedup.dotSeqSql("p.v", "cc.cv")} * 1000000000.0)
             AS BIGINT) AS coarse
         FROM probe_cells pc
         JOIN vecs p ON p.vec_id = pc.probe_id
         JOIN cents cc ON cc.cent_id = pc.cell),
       lutq AS (SELECT pr.probe_id, pr.cell, pr.coarse, sp.sub,
           c.cent_id AS code,
           CAST(floor(${Dedup.dotSeqSql(sl("pr.rp"), sl("c.cbv"))}
             * 1000000000.0) AS BIGINT) AS pdot
         FROM pres pr, subspaces sp, cb c),
       adcq AS (SELECT l.probe_id, c.neighbor_id,
           CAST(max(l.coarse) + sum(l.pdot) AS BIGINT) AS iscore
         FROM codes c JOIN lutq l
           ON l.cell = c.cell AND l.sub = c.sub AND l.code = c.code
         WHERE l.probe_id <> c.neighbor_id
         GROUP BY 1, 2),
       ipq_shortlist AS (SELECT probe_id, neighbor_id
         FROM (SELECT probe_id, neighbor_id,
                 row_number() OVER (PARTITION BY probe_id
                                    ORDER BY iscore DESC, neighbor_id) AS srk
               FROM adcq) WHERE srk <= $PQ_SHORTLIST),
       ipq_reranked AS (SELECT s.probe_id, s.neighbor_id,
           ${Dedup.dotSeqSql("pv.v", "nv.v")} AS dot
         FROM ipq_shortlist s
         JOIN vecs pv ON pv.vec_id = s.probe_id
         JOIN vecs nv ON nv.vec_id = s.neighbor_id),
       ipq_ranked AS (SELECT probe_id, neighbor_id, dot,
           row_number() OVER (PARTITION BY probe_id
                              ORDER BY dot DESC, neighbor_id) AS rk
         FROM ipq_reranked)"""
  }

  /** SQL twin of the SQ8 pipeline (symmetric scale → codes → integer
    * scores → shortlist → exact rerank).
    */
  private def sq8Sql: String =
    s"""rng AS (SELECT max(abs(x)) AS mx FROM elems),
       q AS (SELECT vec_id,
           list_transform(v, x -> CASE WHEN mx = 0 THEN CAST(0 AS BIGINT)
             ELSE CAST(floor(x * 127.0 / mx + 0.5) AS BIGINT) END) AS qv
         FROM vecs CROSS JOIN rng),
       sq_scored AS (SELECT p.vec_id AS probe_id, c.vec_id AS neighbor_id,
           CAST(list_reduce(list_transform(p.qv, (x, i) -> x * c.qv[i]),
             (acc, x) -> acc + x) AS BIGINT) AS iscore
         FROM q p JOIN q c ON p.vec_id <> c.vec_id
         WHERE p.vec_id IN (SELECT vec_id FROM probe_ids)),
       sq_shortlist AS (SELECT probe_id, neighbor_id
         FROM (SELECT probe_id, neighbor_id,
                 row_number() OVER (PARTITION BY probe_id
                                    ORDER BY iscore DESC, neighbor_id) AS srk
               FROM sq_scored) WHERE srk <= $SQ_SHORTLIST),
       sq_reranked AS (SELECT s.probe_id, s.neighbor_id,
           ${Dedup.dotSeqSql("pv.v", "nv.v")} AS dot
         FROM sq_shortlist s
         JOIN vecs pv ON pv.vec_id = s.probe_id
         JOIN vecs nv ON nv.vec_id = s.neighbor_id),
       sq_ranked AS (SELECT probe_id, neighbor_id, dot,
           row_number() OVER (PARTITION BY probe_id
                              ORDER BY dot DESC, neighbor_id) AS rk
         FROM sq_reranked)"""

  /** SQL twin of the iterated NN-descent rounds (bucket-local base graph,
    * then per round: symmetrize → degree cap → two-hop candidates → fresh
    * re-salted seed pairs → exact rescore → top-k). Assumes
    * vecs/elems/norms + the buckets fragment are in scope.
    * Multiply-referenced CTEs are MATERIALIZED — DuckDB otherwise inlines
    * them per reference and the round chain re-evaluates multiplicatively
    * (the graph_cc_raw lesson).
    */
  private def nndSql: String = {
    val base =
      s"""nnd_ring AS (SELECT vec_id, -1 -
           (${md5LongSql("concat('nnd:', vec_id)")}
             % CAST(ceil((SELECT count(*) FROM vecs) / 8.0) AS BIGINT)) AS bucket
         FROM vecs),
       nnd_lsh AS (SELECT vec_id,
           bucket * CAST(ceil((SELECT count(*) FROM vecs) / 512.0) AS BIGINT) +
           ${md5LongSql("concat('nnd2:', vec_id)")}
             % CAST(ceil((SELECT count(*) FROM vecs) / 512.0) AS BIGINT) AS bucket
         FROM buckets),
       nnd_seeds AS (SELECT vec_id, bucket FROM nnd_lsh
         UNION ALL SELECT vec_id, bucket FROM nnd_ring),
       nnd_pairs AS (SELECT DISTINCT a.vec_id AS u, b.vec_id AS w
         FROM nnd_seeds a
         JOIN nnd_seeds b ON a.bucket = b.bucket AND a.vec_id <> b.vec_id),
       nnd_scored AS MATERIALIZED (SELECT p.u AS src, p.w AS dst,
           ${Dedup.dotSeqSql("pu.v", "pw.v")} / sqrt(nu.nrm * nw.nrm) AS cos
         FROM nnd_pairs p
         JOIN vecs pu ON pu.vec_id = p.u
         JOIN vecs pw ON pw.vec_id = p.w
         JOIN norms nu ON nu.nrm > 0 AND nu.vec_id = p.u
         JOIN norms nw ON nw.nrm > 0 AND nw.vec_id = p.w),
       nnd_g0 AS MATERIALIZED (SELECT src, dst, cos
         FROM (SELECT src, dst, cos,
                 row_number() OVER (PARTITION BY src
                                    ORDER BY cos DESC, dst) AS rk
               FROM nnd_scored) WHERE rk <= $NND_WORKK)"""
    val rounds = (1 to NND_ITERS).map { t =>
      val p = s"nnd_g${t - 1}"
      s"""nnd_und_$t AS (SELECT DISTINCT src, dst, cos FROM (
           SELECT src, dst, cos FROM $p
           UNION ALL SELECT dst, src, cos FROM $p)),
       nnd_cap_$t AS MATERIALIZED (SELECT src, dst
         FROM (SELECT src, dst,
                 row_number() OVER (PARTITION BY src
                                    ORDER BY cos DESC, dst) AS rk
               FROM nnd_und_$t) WHERE rk <= $NND_SAMPLE),
       nnd_ring_$t AS (SELECT vec_id, -1 -
           (${md5LongSql(s"concat('nnd:r$t:', vec_id)")}
             % CAST(ceil((SELECT count(*) FROM vecs) / 8.0) AS BIGINT)) AS bucket
         FROM vecs),
       nnd_lsh_$t AS (SELECT vec_id,
           bucket * CAST(ceil((SELECT count(*) FROM vecs) / 512.0) AS BIGINT) +
           ${md5LongSql(s"concat('nnd2:r$t:', vec_id)")}
             % CAST(ceil((SELECT count(*) FROM vecs) / 512.0) AS BIGINT) AS bucket
         FROM buckets),
       nnd_seeds_$t AS (SELECT vec_id, bucket FROM nnd_lsh_$t
         UNION ALL SELECT vec_id, bucket FROM nnd_ring_$t),
       nnd_pairs_$t AS (SELECT DISTINCT a.vec_id AS u, b.vec_id AS w
         FROM nnd_seeds_$t a
         JOIN nnd_seeds_$t b ON a.bucket = b.bucket AND a.vec_id <> b.vec_id),
       nnd_cand_$t AS (SELECT DISTINCT u, w FROM (
           SELECT a.src AS u, b.dst AS w FROM nnd_cap_$t a
           JOIN nnd_cap_$t b ON b.src = a.dst WHERE b.dst <> a.src
           UNION ALL SELECT src AS u, dst AS w FROM $p
           UNION ALL SELECT u, w FROM nnd_pairs_$t)),
       nnd_resc_$t AS (SELECT c.u AS src, c.w AS dst,
           ${Dedup.dotSeqSql("pu.v", "pw.v")} / sqrt(nu.nrm * nw.nrm) AS cos
         FROM nnd_cand_$t c
         JOIN vecs pu ON pu.vec_id = c.u
         JOIN vecs pw ON pw.vec_id = c.w
         JOIN norms nu ON nu.vec_id = c.u
         JOIN norms nw ON nw.vec_id = c.w),
       nnd_g$t AS MATERIALIZED (SELECT src, dst, cos
         FROM (SELECT src, dst, cos,
                 row_number() OVER (PARTITION BY src
                                    ORDER BY cos DESC, dst) AS rk
               FROM nnd_resc_$t) WHERE rk <= $NND_WORKK)"""
    }.mkString(",\n       ")
    s"""$base,
       $rounds,
       nnd_ranked AS (SELECT src AS probe_id, dst AS neighbor_id, cos,
           row_number() OVER (PARTITION BY src
                              ORDER BY cos DESC, dst) AS rk
         FROM nnd_g$NND_ITERS)"""
  }

  /** SQL twin of the beam search (entry panel → hop → visited-set
    * anti-join → score fresh → merge, [[GS_HOPS]] unrolled rounds).
    * Assumes the nndSql chain is in scope (uses its final nnd_g graph).
    */
  private def gsSql: String = {
    val gT = s"nnd_g$NND_ITERS"
    // pair score against fixed join aliases (pv/cv vectors, np/nc norms)
    val sc = s"""${Dedup.dotSeqSql("pv.v", "cv.v")} / sqrt(np.nrm * nc.nrm)"""
    val base =
      s"""gs_entries AS (SELECT vec_id FROM vecs
         ORDER BY ${md5LongSql("concat('entry:', vec_id)")}, vec_id LIMIT $GS_ENTRIES),
       gs_und AS MATERIALIZED (SELECT DISTINCT src, dst FROM (
           SELECT src, dst FROM $gT UNION ALL SELECT dst, src FROM $gT)),
       gs_v0 AS MATERIALIZED (SELECT p.vec_id AS probe_id, e.vec_id AS cand,
           $sc AS cos
         FROM gs_entries e CROSS JOIN probe_ids p
         JOIN vecs pv ON pv.vec_id = p.vec_id
         JOIN vecs cv ON cv.vec_id = e.vec_id
         JOIN norms np ON np.vec_id = p.vec_id
         JOIN norms nc ON nc.nrm > 0 AND nc.vec_id = e.vec_id
         WHERE e.vec_id <> p.vec_id)"""
    val hops = (1 to GS_HOPS).map { t =>
      val p = s"gs_v${t - 1}"
      s"""gs_beam_$t AS (SELECT probe_id, cand
         FROM (SELECT probe_id, cand,
                 row_number() OVER (PARTITION BY probe_id
                                    ORDER BY cos DESC, cand) AS rk
               FROM $p) WHERE rk <= $GS_BEAM),
       gs_fresh_$t AS (SELECT DISTINCT b.probe_id, u.dst AS cand
         FROM gs_beam_$t b JOIN gs_und u ON u.src = b.cand
         WHERE u.dst <> b.probe_id
           AND NOT EXISTS (SELECT 1 FROM $p v
                           WHERE v.probe_id = b.probe_id AND v.cand = u.dst)),
       gs_v$t AS MATERIALIZED (SELECT probe_id, cand, cos FROM $p
         UNION ALL
         SELECT f.probe_id, f.cand, $sc AS cos
         FROM gs_fresh_$t f
         JOIN vecs pv ON pv.vec_id = f.probe_id
         JOIN vecs cv ON cv.vec_id = f.cand
         JOIN norms np ON np.vec_id = f.probe_id
         JOIN norms nc ON nc.nrm > 0 AND nc.vec_id = f.cand)"""
    }.mkString(",\n       ")
    s"""$base,
       $hops,
       gs_ranked AS (SELECT probe_id, cand AS neighbor_id, cos,
           row_number() OVER (PARTITION BY probe_id
                              ORDER BY cos DESC, cand) AS rk
         FROM gs_v$GS_HOPS)"""
  }

  /** SQL twin of the ivfCells coarse assignment (same CTE chain as the
    * ann_ivf oracle's head — kept verbatim so the two stay provably the
    * same quantizer).
    */
  private def ivfAssignSql =
    s"""cents AS (SELECT vec_id AS cent_id, v AS cv FROM vecs
           WHERE vec_id IN (SELECT vec_id FROM cent_ids)),
       sims AS (SELECT x.vec_id, c.cent_id,
           ${Dedup.dotSeqSql("x.v", "c.cv")}
             / sqrt(nx.nrm * nc.nrm) AS csim
         FROM vecs x
         CROSS JOIN cents c
         JOIN norms nx ON nx.vec_id = x.vec_id
         JOIN norms nc ON nc.vec_id = c.cent_id),
       ranked AS (SELECT vec_id, cent_id, csim,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY csim DESC, cent_id) AS crk
         FROM sims),
       assignment AS (SELECT vec_id, cent_id AS cell FROM ranked WHERE crk = 1)"""

  /** SQL twin of the incremental IVF merge: frozen old-corpus codebook,
    * every vector (old and new) assigned to its nearest frozen centroid.
    */
  /** The shared CTE chain of the incremental-IVF oracles: frozen old-corpus
    * codebook, full-corpus nearest-centroid ranking, old/new provenance.
    */
  private def incrementalCtes: String =
    s"""$vecsSql, $normsSql,
       newb AS (SELECT vec_id FROM vecs
         WHERE ${md5LongSql("concat('batch:', vec_id)")} % 5 = 0),
       old_ids AS (SELECT vec_id FROM vecs
         WHERE vec_id NOT IN (SELECT vec_id FROM newb)),
       inc_cent_ids AS (SELECT vec_id FROM old_ids
         ORDER BY ${md5LongSql("concat('cent:', vec_id)")}, vec_id
         LIMIT $CENT_COUNT),
       inc_cents AS (SELECT vec_id AS cent_id, v AS cv FROM vecs
         WHERE vec_id IN (SELECT vec_id FROM inc_cent_ids)),
       inc_sims AS (SELECT x.vec_id, c.cent_id,
           ${Dedup.dotSeqSql("x.v", "c.cv")} / sqrt(nx.nrm * nc.nrm) AS csim
         FROM vecs x
         CROSS JOIN inc_cents c
         JOIN norms nx ON nx.vec_id = x.vec_id
         JOIN norms nc ON nc.vec_id = c.cent_id),
       inc_ranked AS (SELECT vec_id, cent_id, csim,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY csim DESC, cent_id) AS crk
         FROM inc_sims),
       inc_merged AS (SELECT vec_id, cent_id AS cell, csim,
           CASE WHEN vec_id IN (SELECT vec_id FROM newb)
                THEN 'new' ELSE 'old' END AS src
         FROM inc_ranked WHERE crk = 1)"""

  private def incrementalSql: String =
    s"""WITH $incrementalCtes
       SELECT vec_id, cell,
         ${graft.core.Determinism.r4Sql("csim")} AS csim, src
       FROM inc_merged ORDER BY vec_id"""

  private def cellDriftSql: String =
    s"""WITH $incrementalCtes,
       occ AS (SELECT cell,
           CAST(sum(CASE WHEN src = 'old' THEN 1 ELSE 0 END) AS BIGINT) AS n_old,
           CAST(sum(CASE WHEN src = 'new' THEN 1 ELSE 0 END) AS BIGINT) AS n_new
         FROM inc_merged GROUP BY cell)
       SELECT cell, n_old, n_new,
         ${graft.core.Determinism.r4Sql(
           "CAST(n_old + n_new AS DOUBLE) / greatest(n_old, 1)")} AS growth,
         CAST(2 * (n_old + n_new) >= 3 * greatest(n_old, CAST(1 AS BIGINT))
           AS INTEGER) AS retrain_flag
       FROM occ ORDER BY cell"""

  /** ann_recall_ivf's oracle with ONE substitution: the codebook ids come
    * from the frozen OLD-corpus draw (the incrementalSql chain) instead of
    * the whole-corpus draw — everything downstream (assignment, probe
    * cells, scan, recall join) is kept verbatim so the two gates are
    * provably the same search over differently provenanced quantizers.
    */
  private def recallIncrementalSql: String =
    s"""WITH $vecsSql, $normsSql, $probeIdsSql,
       newb AS (SELECT vec_id FROM vecs
         WHERE ${md5LongSql("concat('batch:', vec_id)")} % 5 = 0),
       old_ids AS (SELECT vec_id FROM vecs
         WHERE vec_id NOT IN (SELECT vec_id FROM newb)),
       cent_ids AS (SELECT vec_id FROM old_ids
         ORDER BY ${md5LongSql("concat('cent:', vec_id)")}, vec_id
         LIMIT $CENT_COUNT),
       bf_dots AS (SELECT p.vec_id AS probe_id, c.vec_id AS neighbor_id,
           ${Dedup.dotSeqSql("p.v", "c.v")} AS dot
         FROM vecs p JOIN vecs c
           ON p.vec_id IN (SELECT vec_id FROM probe_ids) AND p.vec_id <> c.vec_id),
       bf_scored AS (SELECT probe_id, neighbor_id,
           dot / sqrt(np.nrm * nc.nrm) AS cos
         FROM bf_dots
         JOIN norms np ON np.vec_id = probe_id
         JOIN norms nc ON nc.vec_id = neighbor_id),
       bf_ranked AS (SELECT probe_id, neighbor_id,
           row_number() OVER (PARTITION BY probe_id
                              ORDER BY cos DESC, neighbor_id) AS rk
         FROM bf_scored),
       bf AS (SELECT probe_id, neighbor_id FROM bf_ranked WHERE rk <= $CAND_TOPK),
       cents AS (SELECT vec_id AS cent_id, v AS cv FROM vecs
         WHERE vec_id IN (SELECT vec_id FROM cent_ids)),
       sims AS (SELECT x.vec_id, c.cent_id,
           ${Dedup.dotSeqSql("x.v", "c.cv")}
             / sqrt(nx.nrm * nc.nrm) AS csim
         FROM vecs x
         CROSS JOIN cents c
         JOIN norms nx ON nx.vec_id = x.vec_id
         JOIN norms nc ON nc.vec_id = c.cent_id),
       ranked AS (SELECT vec_id, cent_id, csim,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY csim DESC, cent_id) AS crk
         FROM sims),
       assignment AS (SELECT vec_id, cent_id AS cell FROM ranked WHERE crk = 1),
       probe_cells AS (SELECT vec_id AS probe_id, cent_id AS cell
         FROM ranked WHERE vec_id IN (SELECT vec_id FROM probe_ids)
           AND crk <= $NPROBE),
       cand AS (SELECT pc.probe_id, a.vec_id AS neighbor_id,
           ${Dedup.dotSeqSql("pv.v", "nv.v")}
             / sqrt(np.nrm * nn.nrm) AS cos
         FROM probe_cells pc
         JOIN assignment a ON a.cell = pc.cell AND a.vec_id <> pc.probe_id
         JOIN vecs pv ON pv.vec_id = pc.probe_id
         JOIN vecs nv ON nv.vec_id = a.vec_id
         JOIN norms np ON np.vec_id = pc.probe_id
         JOIN norms nn ON nn.vec_id = a.vec_id),
       final_ranked AS (SELECT probe_id, neighbor_id, cos,
           row_number() OVER (PARTITION BY probe_id
                              ORDER BY cos DESC, neighbor_id) AS rk
         FROM cand),
       ivfk AS (SELECT probe_id, neighbor_id FROM final_ranked WHERE rk <= $CAND_TOPK)
       SELECT bf.probe_id, count(ivfk.neighbor_id) AS n_match,
         ${graft.core.Determinism.r4Sql(s"CAST(count(ivfk.neighbor_id) AS DOUBLE) / $CAND_TOPK")} AS recall
       FROM bf LEFT JOIN ivfk
         ON ivfk.probe_id = bf.probe_id AND ivfk.neighbor_id = bf.neighbor_id
       GROUP BY 1 ORDER BY 1"""

  val oracles: Map[String, String] = Map(
    "ann_incremental" -> incrementalSql,
    "ann_cell_drift" -> cellDriftSql,
    "ann_recall_incremental" -> recallIncrementalSql,
    "ann_kmeans_step" ->
      s"""WITH $vecsSql, $elemsSql, $normsSql, $centIdsSql,
         $ivfAssignSql
         SELECT a.cell, CAST(e.i - 1 AS INTEGER) AS dim,
           CAST(count(*) AS BIGINT) AS n_members,
           CAST(sum(CAST(floor(e.x * 1000000.0 + 0.5) / 1000000.0
             AS DECIMAL(28,6))) AS DOUBLE) AS sum_val
         FROM elems e JOIN assignment a ON a.vec_id = e.vec_id
         GROUP BY 1, 2 ORDER BY 1, 2""",
    "ann_pq_train" ->
      s"""WITH $vecsSql, $elemsSql, $probeIdsSql,
         $pqSql
         SELECT c.sub, c.code,
           CAST((e.i - 1) % $PQ_SUBDIM AS INTEGER) AS subdim,
           CAST(count(*) AS BIGINT) AS n_members,
           CAST(sum(CAST(floor(e.x * 1000000.0 + 0.5) / 1000000.0
             AS DECIMAL(28,6))) AS DOUBLE) AS sum_val
         FROM elems e
         JOIN codes c ON c.neighbor_id = e.vec_id
           AND c.sub = CAST((e.i - 1) // $PQ_SUBDIM AS INTEGER)
         GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""",
    "ann_pq" ->
      s"""WITH $vecsSql, $probeIdsSql,
         $pqSql
         SELECT probe_id, rk, neighbor_id,
           ${graft.core.Determinism.r4Sql("dot")} AS dot
         FROM pq_ranked WHERE rk <= $CAND_TOPK ORDER BY probe_id, rk""",
    "ann_recall" ->
      s"""WITH $vecsSql, $elemsSql, $normsSql, $probeIdsSql,
         $bucketsSqlFragment,
         bf_dots AS (SELECT p.vec_id AS probe_id, c.vec_id AS neighbor_id,
             ${Dedup.dotSeqSql("p.v", "c.v")} AS dot
           FROM vecs p JOIN vecs c
             ON p.vec_id IN (SELECT vec_id FROM probe_ids) AND p.vec_id <> c.vec_id),
         bf_scored AS (SELECT probe_id, neighbor_id,
             dot / sqrt(np.nrm * nc.nrm) AS cos
           FROM bf_dots
           JOIN norms np ON np.vec_id = probe_id
           JOIN norms nc ON nc.vec_id = neighbor_id),
         bf_ranked AS (SELECT probe_id, neighbor_id,
             row_number() OVER (PARTITION BY probe_id
                                ORDER BY cos DESC, neighbor_id) AS rk
           FROM bf_scored),
         bf AS (SELECT probe_id, neighbor_id FROM bf_ranked WHERE rk <= $CAND_TOPK),
         $probeBucketsSql,
         l_cand AS (SELECT p.vec_id AS probe_id, c.vec_id AS neighbor_id
           FROM probe_buckets p JOIN buckets c ON p.bucket = c.bucket
           WHERE p.vec_id <> c.vec_id),
         l_dots AS (SELECT probe_id, neighbor_id,
             ${Dedup.dotSeqSql("pv.v", "cv.v")} AS dot
           FROM l_cand
           JOIN vecs pv ON pv.vec_id = probe_id
           JOIN vecs cv ON cv.vec_id = neighbor_id),
         l_scored AS (SELECT probe_id, neighbor_id,
             dot / sqrt(np.nrm * nc.nrm) AS cos
           FROM l_dots
           JOIN norms np ON np.vec_id = probe_id
           JOIN norms nc ON nc.vec_id = neighbor_id),
         l_ranked AS (SELECT probe_id, neighbor_id,
             row_number() OVER (PARTITION BY probe_id
                                ORDER BY cos DESC, neighbor_id) AS rk
           FROM l_scored),
         lshk AS (SELECT probe_id, neighbor_id FROM l_ranked WHERE rk <= $CAND_TOPK)
         SELECT bf.probe_id, count(lshk.neighbor_id) AS n_match,
           ${graft.core.Determinism.r4Sql(s"CAST(count(lshk.neighbor_id) AS DOUBLE) / $CAND_TOPK")} AS recall
         FROM bf LEFT JOIN lshk
           ON lshk.probe_id = bf.probe_id AND lshk.neighbor_id = bf.neighbor_id
         GROUP BY 1 ORDER BY 1""",
    "ann_sq8" ->
      s"""WITH $vecsSql, $elemsSql, $probeIdsSql,
         $sq8Sql
         SELECT probe_id, rk, neighbor_id,
           ${graft.core.Determinism.r4Sql("dot")} AS dot
         FROM sq_ranked WHERE rk <= $CAND_TOPK ORDER BY probe_id, rk""",
    "ann_recall_sq8" ->
      s"""WITH $vecsSql, $elemsSql, $normsSql, $probeIdsSql,
         $sq8Sql,
         bf_dots AS (SELECT p.vec_id AS probe_id, c.vec_id AS neighbor_id,
             ${Dedup.dotSeqSql("p.v", "c.v")} AS dot
           FROM vecs p JOIN vecs c
             ON p.vec_id IN (SELECT vec_id FROM probe_ids) AND p.vec_id <> c.vec_id),
         bf_scored AS (SELECT probe_id, neighbor_id,
             dot / sqrt(np.nrm * nc.nrm) AS cos
           FROM bf_dots
           JOIN norms np ON np.vec_id = probe_id
           JOIN norms nc ON nc.vec_id = neighbor_id),
         bf_ranked AS (SELECT probe_id, neighbor_id,
             row_number() OVER (PARTITION BY probe_id
                                ORDER BY cos DESC, neighbor_id) AS rk
           FROM bf_scored),
         bf AS (SELECT probe_id, neighbor_id FROM bf_ranked WHERE rk <= $CAND_TOPK),
         sqk AS (SELECT probe_id, neighbor_id FROM sq_ranked WHERE rk <= $CAND_TOPK)
         SELECT bf.probe_id, count(sqk.neighbor_id) AS n_match,
           ${graft.core.Determinism.r4Sql(s"CAST(count(sqk.neighbor_id) AS DOUBLE) / $CAND_TOPK")} AS recall
         FROM bf LEFT JOIN sqk
           ON sqk.probe_id = bf.probe_id AND sqk.neighbor_id = bf.neighbor_id
         GROUP BY 1 ORDER BY 1""",
    "ann_recall_pq" ->
      s"""WITH $vecsSql, $normsSql, $probeIdsSql,
         $pqSql,
         bf_dots AS (SELECT p.vec_id AS probe_id, c.vec_id AS neighbor_id,
             ${Dedup.dotSeqSql("p.v", "c.v")} AS dot
           FROM vecs p JOIN vecs c
             ON p.vec_id IN (SELECT vec_id FROM probe_ids) AND p.vec_id <> c.vec_id),
         bf_scored AS (SELECT probe_id, neighbor_id,
             dot / sqrt(np.nrm * nc.nrm) AS cos
           FROM bf_dots
           JOIN norms np ON np.vec_id = probe_id
           JOIN norms nc ON nc.vec_id = neighbor_id),
         bf_ranked AS (SELECT probe_id, neighbor_id,
             row_number() OVER (PARTITION BY probe_id
                                ORDER BY cos DESC, neighbor_id) AS rk
           FROM bf_scored),
         bf AS (SELECT probe_id, neighbor_id FROM bf_ranked WHERE rk <= $CAND_TOPK),
         pqk AS (SELECT probe_id, neighbor_id FROM pq_ranked WHERE rk <= $CAND_TOPK)
         SELECT bf.probe_id, count(pqk.neighbor_id) AS n_match,
           ${graft.core.Determinism.r4Sql(s"CAST(count(pqk.neighbor_id) AS DOUBLE) / $CAND_TOPK")} AS recall
         FROM bf LEFT JOIN pqk
           ON pqk.probe_id = bf.probe_id AND pqk.neighbor_id = bf.neighbor_id
         GROUP BY 1 ORDER BY 1""",
    "ann_ivfpq" ->
      s"""WITH $vecsSql, $normsSql, $probeIdsSql, $centIdsSql,
         $ivfAssignSql,
         $ivfpqSql
         SELECT probe_id, rk, neighbor_id,
           ${graft.core.Determinism.r4Sql("dot")} AS dot
         FROM ipq_ranked WHERE rk <= $CAND_TOPK ORDER BY probe_id, rk""",
    "ann_recall_ivfpq" ->
      s"""WITH $vecsSql, $normsSql, $probeIdsSql, $centIdsSql,
         bf_dots AS (SELECT p.vec_id AS probe_id, c.vec_id AS neighbor_id,
             ${Dedup.dotSeqSql("p.v", "c.v")} AS dot
           FROM vecs p JOIN vecs c
             ON p.vec_id IN (SELECT vec_id FROM probe_ids) AND p.vec_id <> c.vec_id),
         bf_scored AS (SELECT probe_id, neighbor_id,
             dot / sqrt(np.nrm * nc.nrm) AS cos
           FROM bf_dots
           JOIN norms np ON np.vec_id = probe_id
           JOIN norms nc ON nc.vec_id = neighbor_id),
         bf_ranked AS (SELECT probe_id, neighbor_id,
             row_number() OVER (PARTITION BY probe_id
                                ORDER BY cos DESC, neighbor_id) AS rk
           FROM bf_scored),
         bf AS (SELECT probe_id, neighbor_id FROM bf_ranked WHERE rk <= $CAND_TOPK),
         $ivfAssignSql,
         $ivfpqSql,
         ipqk AS (SELECT probe_id, neighbor_id FROM ipq_ranked WHERE rk <= $CAND_TOPK)
         SELECT bf.probe_id, count(ipqk.neighbor_id) AS n_match,
           ${graft.core.Determinism.r4Sql(s"CAST(count(ipqk.neighbor_id) AS DOUBLE) / $CAND_TOPK")} AS recall
         FROM bf LEFT JOIN ipqk
           ON ipqk.probe_id = bf.probe_id AND ipqk.neighbor_id = bf.neighbor_id
         GROUP BY 1 ORDER BY 1""",
    "ann_recall_nnd_clustered" ->
      s"""WITH $clusteredVecsSql, $elemsSql, $normsSql, $probeIdsSql,
         bf_dots AS (SELECT p.vec_id AS probe_id, c.vec_id AS neighbor_id,
             ${Dedup.dotSeqSql("p.v", "c.v")} AS dot
           FROM vecs p JOIN vecs c
             ON p.vec_id IN (SELECT vec_id FROM probe_ids) AND p.vec_id <> c.vec_id),
         bf_scored AS (SELECT probe_id, neighbor_id,
             dot / sqrt(np.nrm * nc.nrm) AS cos
           FROM bf_dots
           JOIN norms np ON np.vec_id = probe_id
           JOIN norms nc ON nc.vec_id = neighbor_id),
         bf_ranked AS (SELECT probe_id, neighbor_id,
             row_number() OVER (PARTITION BY probe_id
                                ORDER BY cos DESC, neighbor_id) AS rk
           FROM bf_scored),
         bf AS (SELECT probe_id, neighbor_id FROM bf_ranked WHERE rk <= $CAND_TOPK),
         $bucketsSqlFragment,
         $nndSql,
         nndk AS (SELECT probe_id, neighbor_id FROM nnd_ranked WHERE rk <= $CAND_TOPK)
         SELECT bf.probe_id, count(nndk.neighbor_id) AS n_match,
           ${graft.core.Determinism.r4Sql(s"CAST(count(nndk.neighbor_id) AS DOUBLE) / $CAND_TOPK")} AS recall
         FROM bf LEFT JOIN nndk
           ON nndk.probe_id = bf.probe_id AND nndk.neighbor_id = bf.neighbor_id
         GROUP BY 1 ORDER BY 1""",
    "ann_recall_ivfpq_clustered" ->
      s"""WITH $clusteredVecsSql, $normsSql, $probeIdsSql, $centIdsSql,
         bf_dots AS (SELECT p.vec_id AS probe_id, c.vec_id AS neighbor_id,
             ${Dedup.dotSeqSql("p.v", "c.v")} AS dot
           FROM vecs p JOIN vecs c
             ON p.vec_id IN (SELECT vec_id FROM probe_ids) AND p.vec_id <> c.vec_id),
         bf_scored AS (SELECT probe_id, neighbor_id,
             dot / sqrt(np.nrm * nc.nrm) AS cos
           FROM bf_dots
           JOIN norms np ON np.vec_id = probe_id
           JOIN norms nc ON nc.vec_id = neighbor_id),
         bf_ranked AS (SELECT probe_id, neighbor_id,
             row_number() OVER (PARTITION BY probe_id
                                ORDER BY cos DESC, neighbor_id) AS rk
           FROM bf_scored),
         bf AS (SELECT probe_id, neighbor_id FROM bf_ranked WHERE rk <= $CAND_TOPK),
         $ivfAssignSql,
         $ivfpqSql,
         ipqk AS (SELECT probe_id, neighbor_id FROM ipq_ranked WHERE rk <= $CAND_TOPK)
         SELECT bf.probe_id, count(ipqk.neighbor_id) AS n_match,
           ${graft.core.Determinism.r4Sql(s"CAST(count(ipqk.neighbor_id) AS DOUBLE) / $CAND_TOPK")} AS recall
         FROM bf LEFT JOIN ipqk
           ON ipqk.probe_id = bf.probe_id AND ipqk.neighbor_id = bf.neighbor_id
         GROUP BY 1 ORDER BY 1""",
    "ann_nndescent" ->
      s"""WITH $vecsSql, $elemsSql, $normsSql,
         $bucketsSqlFragment,
         $nndSql
         SELECT probe_id, rk, neighbor_id,
           ${graft.core.Determinism.r4Sql("cos")} AS cos
         FROM nnd_ranked WHERE rk <= $CAND_TOPK ORDER BY probe_id, rk""",
    "ann_recall_nnd" ->
      s"""WITH $vecsSql, $elemsSql, $normsSql, $probeIdsSql,
         bf_dots AS (SELECT p.vec_id AS probe_id, c.vec_id AS neighbor_id,
             ${Dedup.dotSeqSql("p.v", "c.v")} AS dot
           FROM vecs p JOIN vecs c
             ON p.vec_id IN (SELECT vec_id FROM probe_ids) AND p.vec_id <> c.vec_id),
         bf_scored AS (SELECT probe_id, neighbor_id,
             dot / sqrt(np.nrm * nc.nrm) AS cos
           FROM bf_dots
           JOIN norms np ON np.vec_id = probe_id
           JOIN norms nc ON nc.vec_id = neighbor_id),
         bf_ranked AS (SELECT probe_id, neighbor_id,
             row_number() OVER (PARTITION BY probe_id
                                ORDER BY cos DESC, neighbor_id) AS rk
           FROM bf_scored),
         bf AS (SELECT probe_id, neighbor_id FROM bf_ranked WHERE rk <= $CAND_TOPK),
         $bucketsSqlFragment,
         $nndSql,
         nndk AS (SELECT probe_id, neighbor_id FROM nnd_ranked WHERE rk <= $CAND_TOPK)
         SELECT bf.probe_id, count(nndk.neighbor_id) AS n_match,
           ${graft.core.Determinism.r4Sql(s"CAST(count(nndk.neighbor_id) AS DOUBLE) / $CAND_TOPK")} AS recall
         FROM bf LEFT JOIN nndk
           ON nndk.probe_id = bf.probe_id AND nndk.neighbor_id = bf.neighbor_id
         GROUP BY 1 ORDER BY 1""",
    "ann_graph_search" ->
      s"""WITH $vecsSql, $elemsSql, $normsSql, $probeIdsSql,
         $bucketsSqlFragment,
         $nndSql,
         $gsSql
         SELECT probe_id, rk, neighbor_id,
           ${graft.core.Determinism.r4Sql("cos")} AS cos
         FROM gs_ranked WHERE rk <= $CAND_TOPK ORDER BY probe_id, rk""",
    "ann_recall_gsearch" ->
      s"""WITH $vecsSql, $elemsSql, $normsSql, $probeIdsSql,
         bf_dots AS (SELECT p.vec_id AS probe_id, c.vec_id AS neighbor_id,
             ${Dedup.dotSeqSql("p.v", "c.v")} AS dot
           FROM vecs p JOIN vecs c
             ON p.vec_id IN (SELECT vec_id FROM probe_ids) AND p.vec_id <> c.vec_id),
         bf_scored AS (SELECT probe_id, neighbor_id,
             dot / sqrt(np.nrm * nc.nrm) AS cos
           FROM bf_dots
           JOIN norms np ON np.vec_id = probe_id
           JOIN norms nc ON nc.vec_id = neighbor_id),
         bf_ranked AS (SELECT probe_id, neighbor_id,
             row_number() OVER (PARTITION BY probe_id
                                ORDER BY cos DESC, neighbor_id) AS rk
           FROM bf_scored),
         bf AS (SELECT probe_id, neighbor_id FROM bf_ranked WHERE rk <= $CAND_TOPK),
         $bucketsSqlFragment,
         $nndSql,
         $gsSql,
         gsk AS (SELECT probe_id, neighbor_id FROM gs_ranked WHERE rk <= $CAND_TOPK)
         SELECT bf.probe_id, count(gsk.neighbor_id) AS n_match,
           ${graft.core.Determinism.r4Sql(s"CAST(count(gsk.neighbor_id) AS DOUBLE) / $CAND_TOPK")} AS recall
         FROM bf LEFT JOIN gsk
           ON gsk.probe_id = bf.probe_id AND gsk.neighbor_id = bf.neighbor_id
         GROUP BY 1 ORDER BY 1""",
    "ann_recall_ivf" ->
      s"""WITH $vecsSql, $normsSql, $probeIdsSql, $centIdsSql,
         bf_dots AS (SELECT p.vec_id AS probe_id, c.vec_id AS neighbor_id,
             ${Dedup.dotSeqSql("p.v", "c.v")} AS dot
           FROM vecs p JOIN vecs c
             ON p.vec_id IN (SELECT vec_id FROM probe_ids) AND p.vec_id <> c.vec_id),
         bf_scored AS (SELECT probe_id, neighbor_id,
             dot / sqrt(np.nrm * nc.nrm) AS cos
           FROM bf_dots
           JOIN norms np ON np.vec_id = probe_id
           JOIN norms nc ON nc.vec_id = neighbor_id),
         bf_ranked AS (SELECT probe_id, neighbor_id,
             row_number() OVER (PARTITION BY probe_id
                                ORDER BY cos DESC, neighbor_id) AS rk
           FROM bf_scored),
         bf AS (SELECT probe_id, neighbor_id FROM bf_ranked WHERE rk <= $CAND_TOPK),
         cents AS (SELECT vec_id AS cent_id, v AS cv FROM vecs
           WHERE vec_id IN (SELECT vec_id FROM cent_ids)),
         sims AS (SELECT x.vec_id, c.cent_id,
             ${Dedup.dotSeqSql("x.v", "c.cv")}
               / sqrt(nx.nrm * nc.nrm) AS csim
           FROM vecs x
           CROSS JOIN cents c
           JOIN norms nx ON nx.vec_id = x.vec_id
           JOIN norms nc ON nc.vec_id = c.cent_id),
         ranked AS (SELECT vec_id, cent_id, csim,
             row_number() OVER (PARTITION BY vec_id
                                ORDER BY csim DESC, cent_id) AS crk
           FROM sims),
         assignment AS (SELECT vec_id, cent_id AS cell FROM ranked WHERE crk = 1),
         probe_cells AS (SELECT vec_id AS probe_id, cent_id AS cell
           FROM ranked WHERE vec_id IN (SELECT vec_id FROM probe_ids)
             AND crk <= $NPROBE),
         cand AS (SELECT pc.probe_id, a.vec_id AS neighbor_id,
             ${Dedup.dotSeqSql("pv.v", "nv.v")}
               / sqrt(np.nrm * nn.nrm) AS cos
           FROM probe_cells pc
           JOIN assignment a ON a.cell = pc.cell AND a.vec_id <> pc.probe_id
           JOIN vecs pv ON pv.vec_id = pc.probe_id
           JOIN vecs nv ON nv.vec_id = a.vec_id
           JOIN norms np ON np.vec_id = pc.probe_id
           JOIN norms nn ON nn.vec_id = a.vec_id),
         final_ranked AS (SELECT probe_id, neighbor_id, cos,
             row_number() OVER (PARTITION BY probe_id
                                ORDER BY cos DESC, neighbor_id) AS rk
           FROM cand),
         ivfk AS (SELECT probe_id, neighbor_id FROM final_ranked WHERE rk <= $CAND_TOPK)
         SELECT bf.probe_id, count(ivfk.neighbor_id) AS n_match,
           ${graft.core.Determinism.r4Sql(s"CAST(count(ivfk.neighbor_id) AS DOUBLE) / $CAND_TOPK")} AS recall
         FROM bf LEFT JOIN ivfk
           ON ivfk.probe_id = bf.probe_id AND ivfk.neighbor_id = bf.neighbor_id
         GROUP BY 1 ORDER BY 1""",
    "ann_filter_search" ->
      s"""WITH $vecsSql, $normsSql, $probeIdsSql,
         lab AS (SELECT vec_id, CAST(label AS INTEGER) AS label FROM embeddings),
         dots AS (SELECT p.vec_id AS probe_id, lp.label, c.vec_id AS neighbor_id,
             ${Dedup.dotSeqSql("p.v", "c.v")} AS dot
           FROM vecs p
           JOIN lab lp ON lp.vec_id = p.vec_id
           JOIN vecs c ON c.vec_id <> p.vec_id
           JOIN lab lc ON lc.vec_id = c.vec_id AND lc.label = lp.label
           WHERE p.vec_id IN (SELECT vec_id FROM probe_ids)),
         scored AS (SELECT probe_id, label, neighbor_id,
             dot / sqrt(np.nrm * nc.nrm) AS cos
           FROM dots
           JOIN norms np ON np.vec_id = probe_id
           JOIN norms nc ON nc.vec_id = neighbor_id),
         ranked AS (SELECT probe_id, label, neighbor_id, cos,
             row_number() OVER (PARTITION BY probe_id
                                ORDER BY cos DESC, neighbor_id) AS rk
           FROM scored)
         SELECT probe_id, label, rk, neighbor_id,
           ${graft.core.Determinism.r4Sql("cos")} AS cos
         FROM ranked WHERE rk <= $CAND_TOPK ORDER BY probe_id, rk""",
    "ann_range_search" ->
      s"""WITH $vecsSql, $normsSql, $probeIdsSql,
         dots AS (SELECT p.vec_id AS probe_id, c.vec_id AS neighbor_id,
             ${Dedup.dotSeqSql("p.v", "c.v")} AS dot
           FROM vecs p JOIN vecs c
             ON p.vec_id IN (SELECT vec_id FROM probe_ids) AND p.vec_id <> c.vec_id),
         scored AS (SELECT probe_id, neighbor_id,
             dot / sqrt(np.nrm * nc.nrm) AS cos
           FROM dots
           JOIN norms np ON np.vec_id = probe_id
           JOIN norms nc ON nc.vec_id = neighbor_id)
         SELECT probe_id, neighbor_id, ${graft.core.Determinism.r4Sql("cos")} AS cos
         FROM scored WHERE cos >= $RangeTau ORDER BY probe_id, neighbor_id""",
    "ann_bruteforce" ->
      s"""WITH $vecsSql, $normsSql, $probeIdsSql,
         dots AS (SELECT p.vec_id AS probe_id, c.vec_id AS neighbor_id,
             ${Dedup.dotSeqSql("p.v", "c.v")} AS dot
           FROM vecs p JOIN vecs c
             ON p.vec_id IN (SELECT vec_id FROM probe_ids) AND p.vec_id <> c.vec_id),
         scored AS (SELECT probe_id, neighbor_id,
             dot / sqrt(np.nrm * nc.nrm) AS cos
           FROM dots
           JOIN norms np ON np.vec_id = probe_id
           JOIN norms nc ON nc.vec_id = neighbor_id),
         ranked AS (SELECT probe_id, neighbor_id, cos,
             row_number() OVER (PARTITION BY probe_id
                                ORDER BY cos DESC, neighbor_id) AS rk
           FROM scored)
         SELECT probe_id, rk, neighbor_id, ${graft.core.Determinism.r4Sql("cos")} AS cos
         FROM ranked WHERE rk <= $TOPK ORDER BY probe_id, rk""",
    "ann_ivf" ->
      s"""WITH $vecsSql, $normsSql, $probeIdsSql, $centIdsSql,
         cents AS (SELECT vec_id AS cent_id, v AS cv FROM vecs
           WHERE vec_id IN (SELECT vec_id FROM cent_ids)),
         sims AS (SELECT x.vec_id, c.cent_id,
             ${Dedup.dotSeqSql("x.v", "c.cv")}
               / sqrt(nx.nrm * nc.nrm) AS csim
           FROM vecs x
           CROSS JOIN cents c
           JOIN norms nx ON nx.vec_id = x.vec_id
           JOIN norms nc ON nc.vec_id = c.cent_id),
         ranked AS (SELECT vec_id, cent_id, csim,
             row_number() OVER (PARTITION BY vec_id
                                ORDER BY csim DESC, cent_id) AS crk
           FROM sims),
         assignment AS (SELECT vec_id, cent_id AS cell FROM ranked WHERE crk = 1),
         probe_cells AS (SELECT vec_id AS probe_id, cent_id AS cell
           FROM ranked WHERE vec_id IN (SELECT vec_id FROM probe_ids)
             AND crk <= $NPROBE),
         cand AS (SELECT pc.probe_id, a.vec_id AS neighbor_id,
             ${Dedup.dotSeqSql("pv.v", "nv.v")}
               / sqrt(np.nrm * nn.nrm) AS cos
           FROM probe_cells pc
           JOIN assignment a ON a.cell = pc.cell AND a.vec_id <> pc.probe_id
           JOIN vecs pv ON pv.vec_id = pc.probe_id
           JOIN vecs nv ON nv.vec_id = a.vec_id
           JOIN norms np ON np.vec_id = pc.probe_id
           JOIN norms nn ON nn.vec_id = a.vec_id),
         final_ranked AS (SELECT probe_id, neighbor_id, cos,
             row_number() OVER (PARTITION BY probe_id
                                ORDER BY cos DESC, neighbor_id) AS rk
           FROM cand)
         SELECT probe_id, rk, neighbor_id, ${graft.core.Determinism.r4Sql("cos")} AS cos
         FROM final_ranked WHERE rk <= $CAND_TOPK ORDER BY probe_id, rk""",
    "ann_lsh" ->
      s"""WITH $vecsSql, $elemsSql, $normsSql, $probeIdsSql,
         $bucketsSqlFragment,
         $probeBucketsSql,
         cand AS (SELECT p.vec_id AS probe_id, c.vec_id AS neighbor_id
           FROM probe_buckets p JOIN buckets c ON p.bucket = c.bucket
           WHERE p.vec_id <> c.vec_id),
         dots AS (SELECT probe_id, neighbor_id,
             ${Dedup.dotSeqSql("pv.v", "cv.v")} AS dot
           FROM cand
           JOIN vecs pv ON pv.vec_id = probe_id
           JOIN vecs cv ON cv.vec_id = neighbor_id),
         scored AS (SELECT probe_id, neighbor_id,
             dot / sqrt(np.nrm * nc.nrm) AS cos
           FROM dots
           JOIN norms np ON np.vec_id = probe_id
           JOIN norms nc ON nc.vec_id = neighbor_id),
         ranked AS (SELECT probe_id, neighbor_id, cos,
             row_number() OVER (PARTITION BY probe_id
                                ORDER BY cos DESC, neighbor_id) AS rk
           FROM scored)
         SELECT probe_id, rk, neighbor_id, ${graft.core.Determinism.r4Sql("cos")} AS cos
         FROM ranked WHERE rk <= $CAND_TOPK ORDER BY probe_id, rk"""
  )
}
