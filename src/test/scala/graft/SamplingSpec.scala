package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.queries.Sampling

class SamplingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  test("shuffle_shard: a permutation — every doc exactly once, seq contiguous per shard, rerun-identical") {
    val rows = Sampling.queries("sample_shuffle_shard")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val total = graft.core.Tables.documents(spark, sf).count()
    assert(rows.length == total) // every doc assigned, none duplicated
    assert(rows.map(_._3).distinct.length == total)
    assert(rows.forall { case (shard, _, _) => shard >= 0 && shard < 32 })
    // within each shard the sequence is exactly 1..n — a dense, gap-free
    // training order a reader can consume positionally
    for ((_, grp) <- rows.groupBy(_._1))
      assert(grp.map(_._2).sorted.toSeq == (1L to grp.length).toSeq)
    // determinism: the epoch order must not depend on run or partitioning
    val again = Sampling.queries("sample_shuffle_shard")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.toSeq == again.toSeq)
  }

  test("mixture: kept fraction tracks each stratum's rate; fully deterministic") {
    val rows = Sampling.queries("sample_mixture")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(rows.nonEmpty)
    // coins below the stratum rate only
    assert(rows.forall { case (_, src, coin) => coin < Sampling.MixRates(src) })
    // rate-10000 stratum keeps every doc; lower strata keep roughly their share
    val total = graft.core.Tables.documents(spark, sf).count()
    val bySrc = rows.groupBy(_._2).view.mapValues(_.size.toDouble).toMap
    val perStratum = total / 4.0
    assert(bySrc(0) == math.ceil(perStratum) || bySrc(0) == math.floor(perStratum))
    for ((src, rate) <- Sampling.MixRates if src != 0) {
      val expected = perStratum * rate / 10000.0
      assert(math.abs(bySrc.getOrElse(src, 0.0) - expected) < perStratum * 0.15,
        s"stratum $src kept ${bySrc.getOrElse(src, 0.0)}, expected ~$expected")
    }
    // determinism: a second run selects the identical doc set
    val again = Sampling.queries("sample_mixture")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(rows.sameElements(again))
  }

  test("token budget: each source stops at the first doc crossing the cap") {
    val kept = Sampling.queries("sample_token_budget")(spark, sf)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(kept.nonEmpty)
    // soft-cap contract: a kept doc STARTS under budget
    assert(kept.forall { case (_, _, n, cum) => cum - n < Sampling.TokenBudget })
    // per source, kept docs are exactly a prefix of the doc_id order: the
    // doc after the last kept one must start at/over budget
    val all = graft.core.Tables.documents(spark, sf)
      .select(col("doc_id"), (col("doc_id") % 4).cast("int").as("source"),
        size(graft.functions.HashFunctions.tokens(col("text"))).cast("long").as("n"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    for ((src, docs) <- all.groupBy(_._2)) {
      val ordered = docs.sortBy(_._1)
      val keptIds = kept.filter(_._1 == src).map(_._2).toSet
      var cum = 0L
      for ((id, _, n) <- ordered) {
        val startsUnder = cum < Sampling.TokenBudget
        assert(keptIds.contains(id) == startsUnder,
          s"source $src doc $id: cum=$cum keep=${keptIds.contains(id)}")
        cum += n
      }
    }
  }

  test("interleave: global order rotates sources, indices unique and consistent") {
    val rows = Sampling.queries("sample_interleave")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(rows.nonEmpty)
    // order index encodes its source (round-robin rotation) and is unique
    assert(rows.forall { case (_, src, idx) => idx % 4 == src })
    assert(rows.map(_._3).distinct.length == rows.length)
    // within a source, doc order is preserved and ranks are dense
    for ((src, docs) <- rows.groupBy(_._2)) {
      val ordered = docs.sortBy(_._3)
      assert(ordered.map(_._1).toSeq == docs.map(_._1).sorted.toSeq,
        s"source $src order broken")
      assert(ordered.map(_._3 / 4).toSeq == (0L until docs.length.toLong))
    }
  }

  test("pack: offsets tile each shard's token stream; boundaries span") {
    val rows = Sampling.queries("sample_pack")(spark, sf)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    // in-sequence offset always fits; every doc touches >= 1 sequence
    assert(rows.forall { case (_, _, _, _, off, nseq) =>
      off >= 0 && off < Sampling.SeqLen && nseq >= 1 })
    for ((shard, docs) <- rows.groupBy(_._1)) {
      val ordered = docs.sortBy(_._2)
      // contiguous packing: each doc starts where the previous one ended
      var cum = 0L
      for ((_, _, n, seqId, offIn, nSeqs) <- ordered) {
        assert(seqId == cum / Sampling.SeqLen && offIn == cum % Sampling.SeqLen,
          s"shard $shard: expected offset $cum")
        // span count = boundary crossings + 1
        val lastTok = cum + math.max(n, 1L) - 1
        assert(nSeqs == lastTok / Sampling.SeqLen - cum / Sampling.SeqLen + 1)
        cum += n
      }
    }
  }

  test("temperature: rarest source keeps 100%; rates follow sqrt weights") {
    val rows = Sampling.queries("sample_temperature")(spark, sf)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.length == 4)
    val minDocs = rows.map(_._2).min
    for ((_, nDocs, rate, nSel) <- rows) {
      assert(nSel <= nDocs)
      if (nDocs == minDocs) assert(rate == 10000L)
      // rate_bps = floor(10000 * r / r_max), r = sqrt(n)/n, r_max from the
      // rarest source — same IEEE ops in the same order as the query
      val r = math.sqrt(nDocs.toDouble) / nDocs
      val rMax = math.sqrt(minDocs.toDouble) / minDocs
      val expect = math.floor(r / rMax * 10000.0).toLong
      assert(rate == expect, s"n=$nDocs rate=$rate expect=$expect")
      // selection tracks the rate (md5 coin is uniform): 15% slack
      val expected = nDocs * rate / 10000.0
      assert(math.abs(nSel - expected) < math.max(20.0, nDocs * 0.15))
    }
  }

  test("contamination: benchmark docs match every one of their shingles") {
    val rows = graft.queries.Text.queries("text_contamination")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    assert(rows.nonEmpty)
    val bench = rows.filter(_._4 == 1)
    assert(bench.nonEmpty)
    // planted contamination: a benchmark doc's shingles are all in the set
    assert(bench.forall { case (_, nsh, ncon, _) => ncon == nsh },
      "benchmark doc not fully matched")
    // and matches never exceed a doc's own shingle count
    assert(rows.forall { case (_, nsh, ncon, _) => ncon <= nsh })
  }
  test("dsir: target-language docs score above the rest on average") {
    val scores = Sampling.queries("sample_dsir")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(scores.nonEmpty && scores.forall(_._2 > 0))
    val langs = graft.core.Tables.documents(spark, sf)
      .select("doc_id", "lang").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val (en, rest) = scores.partition(s => langs(s._1) == "en")
    val enAvg = en.map(_._3).sum / en.length
    val restAvg = rest.map(_._3).sum / rest.length
    assert(enAvg > restAvg,
      s"importance scoring failed to separate: en=$enAvg rest=$restAvg")
    // determinism (the r6-floor + DECIMAL-sum recipe)
    val again = Sampling.queries("sample_dsir")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(scores == again)
  }
  test("holdout: stable split, roughly 80/10/10, never migrates") {
    val rows = Sampling.queries("sample_holdout")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val n = rows.length.toDouble
    assert(n > 0)
    val frac = rows.groupBy(_._2).view.mapValues(_.length / n).toMap
    assert(math.abs(frac("train") - 0.8) < 0.08, s"train ${frac("train")}")
    assert(math.abs(frac.getOrElse("val", 0.0) - 0.1) < 0.06)
    assert(math.abs(frac.getOrElse("test", 0.0) - 0.1) < 0.06)
    // growth stability: the sf0.001 corpus is a doc_id prefix of larger
    // corpora — its assignments must be bit-identical within this run too
    val again = Sampling.queries("sample_holdout")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(rows.sameElements(again))
  }
  test("balanced: every stratum lands exactly at the rarest stratum's size") {
    val rows = Sampling.queries("sample_balanced")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val full = graft.core.Tables.documents(spark, sf)
      .select("doc_id", "lang").collect().map(r => (r.getLong(0), r.getString(1)))
    val minN = full.groupBy(_._2).map(_._2.length).min
    val byLang = rows.groupBy(_._2).view.mapValues(_.length).toMap
    assert(byLang.values.forall(_ == minN), s"$byLang != $minN")
    assert(byLang.keySet == full.map(_._2).toSet)
    // deterministic: repeat run selects the identical docs
    val again = Sampling.queries("sample_balanced")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(rows.sameElements(again))
  }

  test("stratified: every stratum contributes exactly max(1, floor(n*pct))") {
    val rows = Sampling.queries("sample_stratified")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val full = graft.core.Tables.documents(spark, sf)
      .select("doc_id", "lang").collect().map(r => (r.getLong(0), r.getString(1)))
    val fullByLang = full.groupBy(_._2).view.mapValues(_.length).toMap
    val gotByLang = rows.groupBy(_._2).view.mapValues(_.length).toMap
    // exactness — the property the binomial mixture coin cannot give
    for ((lang, n) <- fullByLang)
      assert(gotByLang.getOrElse(lang, 0) ==
        math.max(1, n * Sampling.StratPct / 100), s"stratum $lang")
    // sampled rows are real rows
    assert(rows.toSet.subsetOf(full.toSet))
    val again = Sampling.queries("sample_stratified")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(rows.sameElements(again))
  }

  test("reservoir: exactly K rows, a subset of the corpus, stable; TakeOrdered plan") {
    val df = Sampling.queries("sample_reservoir")(spark, sf)
    val rows = df.collect().map(r => (r.getLong(0), r.getString(1)))
    assert(rows.length == Sampling.ReservoirK)
    val full = graft.core.Tables.documents(spark, sf)
      .select("doc_id", "source").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(rows.toSet.subsetOf(full.toSet))
    val again = Sampling.queries("sample_reservoir")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(rows.sameElements(again))
    // the K-smallest-hashes selection must plan as a distributed top-K
    // (partial limit per partition), not a global sort
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrdered"), s"expected TakeOrdered plan:\n$plan")
  }

  test("epoch plan: weights normalize, 4-epoch cap binds, deficit accounting") {
    val rows = graft.queries.Sampling.queries("sample_epoch_plan")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6),
        r.getDouble(7)))
    assert(rows.nonEmpty)
    // weights sum to 1 up to the per-source rounding grain
    val wsum = rows.map(_._4).sum
    assert(math.abs(wsum - 1.0) <= rows.length * 1e-6 + 1e-9, s"wsum=$wsum")
    for ((src, _, avail, w, target, epochs, eff, deficit) <- rows) {
      assert(w > 0 && avail > 0)
      // epoch cap and accounting identities
      assert(epochs <= graft.queries.Sampling.MaxEpochs + 1e-9)
      assert(eff <= target + 1e-9, s"$src effective > target")
      assert(deficit >= -1e-9)
      // deficit exactly when the cap truncated the target (up to rounding)
      if (deficit > 1e-3)
        assert(epochs >= graft.queries.Sampling.MaxEpochs - 1e-9,
          s"$src has deficit without a binding cap")
    }
    // the fixture exercises the data-constrained regime: with the 400k
    // budget spread over ~20 small sources, at least one cap must bind
    assert(rows.exists(_._8 > 1e-3), "no source hit the 4-epoch cap")
  }

  test("dedup budget: effective inventory discounts duplication, plan sums to budget") {
    val rows = Sampling.queries("sample_dedup_budget")(spark, sf).collect()
    assert(rows.nonEmpty)
    // effective tokens never exceed raw (weights are <= 1), and the
    // planted dup families guarantee SOME discount in every source
    rows.foreach { r =>
      val raw = r.getLong(1).toDouble
      val eff = r.getDouble(2)
      assert(eff <= raw + 1e-6, s"eff $eff > raw $raw for ${r.get(0)}")
      assert(eff > 0)
      assert(math.abs(r.getDouble(3) - eff / raw) < 1e-3) // dedup_ratio
    }
    assert(rows.exists(r => r.getDouble(2) < r.getLong(1) - 1))
    // source weights form a distribution; targets sum to the epoch budget
    val wsum = rows.map(_.getDouble(4)).sum
    assert(math.abs(wsum - 1.0) < 1e-3, s"weights sum to $wsum")
    val tsum = rows.map(_.getDouble(5)).sum
    assert(math.abs(tsum - Sampling.EpochBudget) < Sampling.EpochBudget * 1e-3)
    // dedup-aware target differs from the raw epoch plan where dup load differs
    val rawPlan = Sampling.queries("sample_epoch_plan")(spark, sf)
      .select("source", "target_tokens").collect()
      .map(r => r.get(0) -> r.getDouble(1)).toMap
    assert(rows.exists(r => math.abs(r.getDouble(5) - rawPlan(r.get(0))) > 1.0))
  }
}
