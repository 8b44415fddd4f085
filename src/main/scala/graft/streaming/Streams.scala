package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface over the events schema. The reference is
  * batch-only (SURVEY §2.10) — this is the engine's extension path for the
  * same event shape arriving as a stream: windowed aggregation with
  * watermarked late-data handling, and stateful sessionization via
  * flatMapGroupsWithState.
  *
  * Every transform is a pure Dataset function usable with either
  * `readStream` (incremental execution) or batch frames (identical
  * results) — which is how StreamingSpec verifies them with MemoryStream.
  */
object Streams {

  /** Tumbling-window event rates with a watermark: counts + mean value per
    * (window, event_type). Late rows beyond the watermark are dropped by
    * the engine; state is bounded by watermark retention.
    */
  def windowedRates(events: DataFrame, window_ : String = "1 hour",
                    watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_).as("w"), col("event_type"))
      // total rather than mean: the source values carry 2 decimals, so
      // group MEANS structurally land on round-half boundaries where
      // parallel summation order flips the last digit; the 2-decimal
      // TOTAL is 0.005 away from any boundary — deterministic under any
      // partitioning (mean = total/n for consumers)
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("total_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n_events"), col("total_value"))

  /** Hopping (sliding) window rates — [[windowedRates]]'s overlapping
    * sibling: counts + 2-decimal totals per (window, event_type) where
    * each event lands in `window/slide` overlapping windows (Spark's
    * native `window(col, w, slide)` expansion — a codegen'd per-row
    * explode, no self-join). The smoother trend line a rate dashboard
    * plots; same watermark/state contract as the tumbling form.
    */
  def hoppingRates(events: DataFrame, window_ : String = "1 hour",
                   slide: String = "30 minutes",
                   watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_, slide).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("total_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n_events"), col("total_value"))

  /** Streaming windowed calibration monitor — [[windowedRates]]'s shape
    * applied to MODEL-QUALITY telemetry: per (tumbling window, score
    * bin), the observation count, positive-label count, and 4-decimal
    * score total of a live (ts, label, score) prediction stream. The
    * production read behind [[graft.ops.Models.calibrationError]]: a
    * bin whose positive rate drifts away from its mean score inside a
    * window is a model going stale in real time, long before an offline
    * eval runs. Consumers derive pos_rate = n_pos/n and the per-window
    * ECE from these exact integer counts downstream. Rows with a null
    * score OR a null label are filtered out before counting, so n
    * counts LABELED observations only and pos_rate is never deflated
    * by unlabeled traffic.
    *
    * Determinism: counts and label sums are exact integers; scores
    * quantize to the 2^-20 dyadic lattice BEFORE summing (round-6
    * decimals are not binary-exact, and window sums of them land on
    * round-4 boundaries where accumulation order flips the digit — the
    * anovaOneWay lattice rule), so the 4-decimal published total is a
    * correctly-rounded function of an ORDER-EXACT sum. Watermarked
    * state is window-bounded; the same transform runs identically on a
    * batch frame, which is how the gate hash-checks it.
    */
  def windowedCalibration(scored: DataFrame, tsCol: String,
                          labelCol: String, scoreCol: String, bins: Int,
                          window_ : String = "1 hour",
                          watermark: String = "10 minutes"): DataFrame = {
    require(bins > 0, "windowedCalibration needs bins > 0")
    val sq = floor(col(scoreCol).cast("double") * 1048576.0) / 1048576.0
    scored
      .withWatermark(tsCol, watermark)
      // unlabeled rows are excluded entirely (not just from n_pos):
      // a null label incrementing n would silently deflate the
      // pos_rate = n_pos/n consumers derive from this frame
      .where(col(scoreCol).isNotNull && col(labelCol).isNotNull)
      .groupBy(window(col(tsCol), window_).as("w"),
        least(greatest(floor(sq * bins), lit(0L)),
          lit(bins - 1L)).cast("int").as("bin"))
      .agg(count(lit(1)).as("n"),
        sum(col(labelCol).cast("long")).as("n_pos"),
        round(sum(sq), 4).as("score_total"))
      .select(col("w.start").as("window_start"), col("bin"),
        col("n"), col("n_pos"), col("score_total"))
  }

  /** Streaming windowed QUALITY gate — the live twin of the
    * [[graft.ops.Text.qualityExpr]] battery: per tumbling window, how
    * many arriving documents pass the quality threshold, the ingestion
    * health number a live curation pipeline alarms on (a kept-rate
    * cliff means the crawler started pulling chrome, encoding junk or
    * a new spam burst — catch it in the window it happens, not in the
    * next batch audit). The per-doc score is a STATELESS projection
    * (the battery is a per-row expression); the only state is one
    * windowed count pair — append-legal, watermark-bounded.
    *
    * `quality_total` is the round-6 scores summed then rounded at 4
    * (the [[windowedCalibration]] score_total precedent) so consumers
    * can derive a mean without a second stateful pass.
    */
  def windowedQualityGate(docs: DataFrame, tsCol: String,
                          textCol: String, minQuality: Double = 0.5,
                          window_ : String = "1 hour",
                          watermark: String = "10 minutes")
      : DataFrame = {
    val q = graft.ops.Text.qualityExpr(col(textCol))
    docs
      .withWatermark(tsCol, watermark)
      .where(col(textCol).isNotNull)
      .groupBy(window(col(tsCol), window_).as("w"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(q >= minQuality, 1L).otherwise(0L)).as("n_kept"),
        round(sum(q), 4).as("quality_total"))
      .select(col("w.start").as("window_start"), col("n_docs"),
        col("n_kept"),
        round(col("n_kept").cast("double") / col("n_docs"), 6)
          .as("kept_rate"),
        col("quality_total"))
  }

  /** Streaming windowed LANGUAGE-MIX monitor — the live twin of
    * [[graft.ops.Text.langId]]: per tumbling window, the arriving-doc
    * count per predicted language and its share of the window — the
    * frontier-health alarm a multilingual crawl watches (a language's
    * share cliff means a registrar block, a DNS change, or a frontier
    * bug starved that slice of the crawl; a surge means a spam farm).
    *
    * Shape: the language label is a STATELESS per-row projection
    * ([[graft.ops.Text.predLangExpr]]); the label domain is FIXED
    * (en/de/es/fr/zh/unknown), so the window folds as ONE stateful
    * aggregation of per-language conditional counts (the
    * [[windowedPsi]] wide-row discipline — no second stateful agg),
    * unpivoted statelessly with stack() so every window emits exactly
    * six rows, zeros included. Shares divide two counts from the SAME
    * row — exact. Append-legal, watermark-bounded.
    */
  def windowedLangMix(docs: DataFrame, tsCol: String, textCol: String,
                      window_ : String = "1 hour",
                      watermark: String = "10 minutes"): DataFrame = {
    val langs = Seq("en", "de", "es", "fr", "zh", "unknown")
    // project the label ONCE before the aggregate: conditional sums
    // are separate aggregate expressions, so an inline predLangExpr
    // would re-run the whole trigram battery per label (6x per row —
    // measured 18s vs sub-second at sf0.01)
    val labeled = docs
      .withWatermark(tsCol, watermark)
      .select(col(tsCol),
        graft.ops.Text.predLangExpr(coalesce(col(textCol), lit("")))
          .as("__lang"))
    val aggs = count(lit(1)).as("n_docs") +:
      langs.map(l =>
        sum(when(col("__lang") === l, 1L).otherwise(0L)).as(s"__$l"))
    val counted = labeled
      .groupBy(window(col(tsCol), window_).as("w"))
      .agg(aggs.head, aggs.tail: _*)
    val stackArgs = langs.map(l => s"'$l', __$l").mkString(", ")
    counted
      .select(col("w.start").as("window_start"), col("n_docs"),
        expr(s"stack(${langs.size}, $stackArgs) AS (lang, n_lang)"))
      .select(col("window_start"), col("lang"), col("n_lang"),
        col("n_docs"),
        round(col("n_lang").cast("double") / col("n_docs"), 6)
          .as("share"))
  }

  /** Streaming windowed ENCODING-DAMAGE monitor — the live twin of
    * [[graft.ops.Text.encodingReport]]: per tumbling window, how many
    * arriving documents carry U+FFFD replacement characters or C0
    * control leakage, with per-kilochar densities — the "a decoder
    * just broke" alarm (a charset regression in one feed shows up as
    * a damage-rate step in the window it ships, not in next week's
    * batch audit). Stateless per-row strip-counts, ONE windowed
    * conditional-sum aggregate, exact long counts with two rounded
    * density quotients — append-legal, watermark-bounded.
    */
  def windowedDamageRate(docs: DataFrame, tsCol: String,
                         textCol: String, window_ : String = "1 hour",
                         watermark: String = "10 minutes"): DataFrame = {
    val t = coalesce(col(textCol), lit(""))
    val repl = (length(t) - length(regexp_replace(t, "�", "")))
      .cast("long")
    val ctrl = (length(t) - length(regexp_replace(t,
      "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]", ""))).cast("long")
    docs
      .withWatermark(tsCol, watermark)
      .select(col(tsCol), length(t).cast("long").as("__nc"),
        repl.as("__repl"), ctrl.as("__ctrl"))
      .groupBy(window(col(tsCol), window_).as("w"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("__nc")).as("__chars"),
        sum((col("__repl") > 0 || col("__ctrl") > 0).cast("long"))
          .as("n_damaged"),
        sum(col("__repl")).as("__r"), sum(col("__ctrl")).as("__c"))
      .select(col("w.start").as("window_start"), col("n_docs"),
        col("n_damaged"),
        round(col("n_damaged").cast("double") / col("n_docs"), 6)
          .as("damage_rate"),
        round(col("__r").cast("double") * 1000 / col("__chars"), 6)
          .as("repl_per_kchars"),
        round(col("__c").cast("double") * 1000 / col("__chars"), 6)
          .as("ctrl_per_kchars"))
  }

  /** Streaming windowed LENGTH-MIX monitor — the live twin of
    * [[graft.ops.Curation.lengthBuckets]]: per tumbling window, the
    * arriving-doc count and token total per token-length bucket — the
    * truncation alarm (a fetcher that starts clipping bodies moves
    * mass from the long buckets to the short ones in the window it
    * breaks, long before a batch length audit runs). Bucket edges are
    * FIXED dyadic token counts (<64, <256, <1024, >=1024), so the
    * domain is a 4-label constant: one stateless bucket projection,
    * ONE wide stateful aggregation ([[windowedPsi]]'s discipline),
    * stack() unpivot with zeros included, shares from the same row —
    * append-legal, watermark-bounded.
    */
  def windowedLengthMix(docs: DataFrame, tsCol: String, textCol: String,
                        window_ : String = "1 hour",
                        watermark: String = "10 minutes"): DataFrame = {
    val buckets = Seq("1_lt64", "2_lt256", "3_lt1024", "4_ge1024")
    val toks = size(split(coalesce(col(textCol), lit("")), " "))
      .cast("long")
    val bucket = when(toks < 64, "1_lt64")
      .when(toks < 256, "2_lt256")
      .when(toks < 1024, "3_lt1024")
      .otherwise("4_ge1024")
    val labeled = docs
      .withWatermark(tsCol, watermark)
      .select(col(tsCol), toks.as("__tok"), bucket.as("__b"))
    val aggs = Seq(count(lit(1)).as("n_docs"),
      sum(col("__tok")).as("n_tokens")) ++
      buckets.flatMap(b => Seq(
        sum(when(col("__b") === b, 1L).otherwise(0L)).as(s"__c_$b"),
        sum(when(col("__b") === b, col("__tok")).otherwise(0L))
          .as(s"__t_$b")))
    val counted = labeled
      .groupBy(window(col(tsCol), window_).as("w"))
      .agg(aggs.head, aggs.tail: _*)
    val stackArgs = buckets.map(b => s"'$b', __c_$b, __t_$b")
      .mkString(", ")
    counted
      .select(col("w.start").as("window_start"), col("n_docs"),
        col("n_tokens"),
        expr(s"stack(${buckets.size}, $stackArgs) " +
          "AS (bucket, n_in_bucket, tokens_in_bucket)"))
      .select(col("window_start"), col("bucket"), col("n_in_bucket"),
        col("tokens_in_bucket"), col("n_docs"), col("n_tokens"),
        round(col("n_in_bucket").cast("double") / col("n_docs"), 6)
          .as("doc_share"),
        round(col("tokens_in_bucket").cast("double") / col("n_tokens"),
          6).as("token_share"))
  }

  /** Streaming windowed PSI drift monitor — the live twin of
    * [[graft.ops.Drift.psiDrift]]: per tumbling window, ONE stateful
    * aggregation folds the value histogram as `bins` conditional
    * counts (bins is a small fixed constant, so the wide row IS the
    * state — no second stateful agg, which append mode would reject),
    * then the PSI against a PINNED reference histogram is a stateless
    * projection. The production shape: the reference distribution
    * ships as a literal (like a model artifact), each window scores
    * against it, and a window whose PSI jumps is drifting from the
    * training distribution in real time.
    *
    * Math is [[graft.ops.Drift.psiDrift]]'s verbatim: clamp-binned
    * values over [lo, hi), Laplace-smoothed p_i = (c_i + 0.5) /
    * (n + 0.5·bins) vs the baseline's identically-smoothed q_i,
    * PSI = Σ (p−q)·ln(p/q) summed in fixed bin order (the float sum
    * order is pinned, so both engines agree bit-for-bit). Also emits
    * the worst bin (max contribution, smallest bin on ties) — the
    * "WHERE did it drift" pointer. NULL values are excluded (a null is
    * a missing measurement, not a minimal one).
    */
  def windowedPsi(events: DataFrame, tsCol: String, valCol: String,
                  baseline: Seq[Long], lo: Double, hi: Double,
                  window_ : String = "1 hour",
                  watermark: String = "10 minutes"): DataFrame = {
    val bins = baseline.size
    require(bins >= 2 && bins <= 32 && hi > lo &&
      baseline.forall(_ >= 0L) && baseline.sum > 0L,
      "windowedPsi needs 2..32 baseline bins with a positive total")
    val v = col(valCol).cast("double")
    val bin = least(greatest(
      floor((v - lit(lo)) / ((lit(hi) - lit(lo)) / lit(bins))),
      lit(0L)), lit(bins - 1L))
    val aggs = count(lit(1)).as("n") +:
      (0 until bins).map(i =>
        sum(when(bin === i, 1L).otherwise(0L)).as(s"__c$i"))
    val counted = events
      .withWatermark(tsCol, watermark)
      .where(col(valCol).isNotNull)
      .groupBy(window(col(tsCol), window_).as("w"))
      .agg(aggs.head, aggs.tail: _*)
    def p(i: Int) =
      (col(s"__c$i") + lit(0.5)) / (col("n") + lit(0.5) * lit(bins))
    def q(i: Int) =
      (lit(baseline(i)) + lit(0.5)) /
        (lit(baseline.sum) + lit(0.5) * lit(bins))
    def contrib(i: Int) = (p(i) - q(i)) * log(p(i) / q(i))
    val psi = (0 until bins).map(contrib).reduce(_ + _)
    val best = greatest((0 until bins).map(contrib): _*)
    val worstBin = coalesce((0 until bins).map(i =>
      when(contrib(i) === best, lit(i))): _*)
    counted.select(col("w.start").as("window_start"), col("n"),
      (round(psi, 6) + lit(0.0)).as("psi"),
      worstBin.as("worst_bin"),
      (round(best, 6) + lit(0.0)).as("worst_contrib"))
  }

  /** Streaming windowed DUP-RATE monitor — the live twin the dedup
    * family lacks: per tumbling window, how many arriving documents
    * carry a content digest ALREADY SEEN within that window
    * (n_dup = Σ per-digest (count − 1)), the crawler-loop alarm — a
    * dup-rate spike means the fetcher is re-crawling a site, a feed is
    * replaying, or a mirror farm entered the frontier; catch it in the
    * window it happens, not in the next batch dedup run.
    *
    * Shape: the digest is a STATELESS per-row projection (md5 of the
    * coalesced text — the [[graft.ops.Dedup]] shuffle rule: 16-byte
    * keys, never payloads); then TWO CHAINED windowed aggregations —
    * (window, digest) counts, re-aggregated per window — the multiple-
    * stateful-operator shape Structured Streaming supports for chained
    * time-window aggregations in append mode. State is bounded by
    * watermark × within-window distinct digests; dup semantics are
    * strictly within-window BY DESIGN (cross-window dedup is
    * [[dedupStream]]'s job; this is the rate monitor).
    *
    * Determinism: every output is an exact integer count except the
    * one rounded dup-rate quotient. The same transform runs identically
    * on a batch frame — how the gate hash-checks it.
    */
  def windowedDupRate(docs: DataFrame, tsCol: String, textCol: String,
                      window_ : String = "1 hour",
                      watermark: String = "10 minutes"): DataFrame = {
    val perDigest = docs
      .withWatermark(tsCol, watermark)
      .select(col(tsCol),
        md5(coalesce(col(textCol), lit(""))).as("__dig"))
      .groupBy(window(col(tsCol), window_).as("w"), col("__dig"))
      .agg(count(lit(1)).as("__c"))
    perDigest
      .groupBy(col("w"))
      .agg(sum(col("__c")).as("n_docs"),
        count(lit(1)).as("n_unique"),
        sum(col("__c") - 1).as("n_dup"))
      .select(col("w.start").as("window_start"), col("n_docs"),
        col("n_unique"), col("n_dup"),
        round(col("n_dup").cast("double") / col("n_docs"), 6)
          .as("dup_rate"))
  }

  /** Streaming exact dedup — [[graft.ops.Dedup.exactDedup]]'s semantics on
    * an unbounded stream: emit only the first occurrence of each content
    * hash. State is bounded by the watermark
    * (`dropDuplicatesWithinWatermark`): a duplicate arriving within the
    * horizon is suppressed; one arriving later than the watermark was, by
    * definition, already emitted at least `watermarkDelay` ago. The
    * shuffle key is the 32-byte digest, never the payload — same scale
    * rule as the batch op. Batch frames degrade to a global
    * dropDuplicates. NOTE the equivalence boundary: the two paths agree
    * only for duplicates whose spans stay within `watermarkDelay` — a
    * duplicate arriving LATER than the watermark horizon is re-emitted by
    * the streaming path (state for its hash was already evicted; that is
    * the price of bounded state), while the batch twin's global
    * dropDuplicates removes it.
    */
  /** Streaming windowed SPAN-HIT monitor — the [[windowedDupRate]]-family
    * twin of [[graft.ops.Dedup.substringScreenAgainstIndex]]: per
    * event-time window, how much of the incoming stream is VERBATIM
    * re-crawl of spans the corpus already holds (digest hits against a
    * persisted [[graft.ops.Dedup.substringSpanIndex]] parameter table).
    * The continuous form of the crawler-loop alarm: a window whose
    * hit_rate jumps is re-fetching yesterday's corpus.
    *
    * Output per window: n_docs (docs contributing >= 1 span —
    * shorter-than-k docs carry no span evidence and are excluded, the
    * batch screen's rule), n_spans, n_hit_spans, n_flagged_docs (docs
    * with >= 1 hit), hit_rate = hit spans / spans.
    *
    * Plan shape (append-legal): a stateless in-row fingerprint explode
    * ([[graft.ops.Dedup.spanFpsCol]] — 8-byte digests only, the window
    * string never leaves the row), a stream-static LEFT equi-join
    * against the digest table (no state), then the [[windowedDupRate]]
    * two-level aggregation — (window, id) then window — both
    * watermark-bounded. `index` MUST be a materialized parameter table
    * (a parquet read or persisted frame), the screen-family contract.
    * Batch frames run the identical plan (the watermark degrades to a
    * no-op), so the gate and the stream cannot diverge.
    */
  def windowedSpanHitRate(docs: DataFrame, tsCol: String, idCol: String,
                          textCol: String, index: DataFrame, k: Int = 8,
                          window_ : String = "1 hour",
                          watermark: String = "10 minutes"): DataFrame = {
    val spans = docs
      .withWatermark(tsCol, watermark)
      .select(col(tsCol), col(idCol),
        explode(graft.ops.Dedup.spanFpsCol(col(textCol), k)).as("__h"))
    val hit = spans.join(
      index.select(col("span_fp").as("__h"), lit(1).as("__m")),
      Seq("__h"), "left")
    val perDoc = hit
      .groupBy(window(col(tsCol), window_).as("w"), col(idCol))
      .agg(count(lit(1)).as("__n"),
        sum(when(col("__m").isNotNull, 1L).otherwise(0L)).as("__k"))
    perDoc.groupBy(col("w"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("__n")).as("n_spans"),
        sum(col("__k")).as("n_hit_spans"),
        sum(when(col("__k") > 0, 1L).otherwise(0L)).as("n_flagged_docs"))
      .select(col("w.start").as("window_start"), col("n_docs"),
        col("n_spans"), col("n_hit_spans"), col("n_flagged_docs"),
        round(col("n_hit_spans").cast("double") / col("n_spans"), 6)
          .as("hit_rate"))
  }

  /** Streaming windowed SPAN-LADDER monitor — [[windowedSpanHitRate]]
    * at every [[graft.ops.Dedup.substringLadder]] width at once: per
    * (event-time window, rung k), how much of the incoming stream is
    * verbatim re-crawl at that span width, against a persisted
    * [[graft.ops.Dedup.substringLadderIndex]] parameter table. The
    * continuous form of the ladder's survival-curve read: a window
    * whose k=32 hit_rate jumps is re-fetching LONG verbatim runs
    * (mirrored articles, licenses), while a jump confined to k=8 is
    * short-phrase churn.
    *
    * Output per (window_start, k): n_docs (docs contributing ≥ 1 span
    * at that width), n_spans, n_hit_spans, n_flagged_docs, hit_rate.
    * Interval-union coverage is deliberately NOT computed here — it
    * needs the per-doc lag window, which is not append-legal; the batch
    * ladder reports it, the stream reports hit counts.
    *
    * Plan shape (append-legal, the [[windowedSpanHitRate]] discipline):
    * ONE stateless in-row multi-rung fingerprint explode (all rungs in
    * one projection, 8-byte digests only), a stream-static LEFT
    * equi-join on (k, digest), then the two-level aggregation —
    * (window, k, id) then (window, k) — both watermark-bounded. `index`
    * MUST be a materialized parameter table, the screen-family
    * contract. Batch frames run the identical plan, so the gate and the
    * stream cannot diverge.
    */
  def windowedSpanLadderMix(docs: DataFrame, tsCol: String, idCol: String,
                            textCol: String, index: DataFrame,
                            ks: Seq[Int] = Seq(8, 16, 32),
                            window_ : String = "1 hour",
                            watermark: String = "10 minutes"): DataFrame = {
    val spans = docs
      .withWatermark(tsCol, watermark)
      .select(col(tsCol), col(idCol),
        explode(graft.ops.Dedup.ladderFpsCol(col(textCol), ks)).as("__s"))
      .select(col(tsCol), col(idCol), col("__s.k").as("k"),
        col("__s.h").as("__h"))
    val hit = spans.join(
      index.select(col("k"), col("span_fp").as("__h"), lit(1).as("__m")),
      Seq("k", "__h"), "left")
    val perDoc = hit
      .groupBy(window(col(tsCol), window_).as("w"), col("k"), col(idCol))
      .agg(count(lit(1)).as("__n"),
        sum(when(col("__m").isNotNull, 1L).otherwise(0L)).as("__k"))
    perDoc.groupBy(col("w"), col("k"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("__n")).as("n_spans"),
        sum(col("__k")).as("n_hit_spans"),
        sum(when(col("__k") > 0, 1L).otherwise(0L)).as("n_flagged_docs"))
      .select(col("w.start").as("window_start"), col("k"), col("n_docs"),
        col("n_spans"), col("n_hit_spans"), col("n_flagged_docs"),
        round(col("n_hit_spans").cast("double") / col("n_spans"), 6)
          .as("hit_rate"))
  }

  /** Streaming windowed TOKENIZER-FERTILITY monitor — the live twin of
    * [[graft.ops.Text.unigramEncode]]'s accounting: per event-time
    * window, tokens-per-word and chars-per-token of the incoming
    * stream under a PUBLISHED [[graft.ops.Text.unigramTrain]] vocab.
    * The tokenizer-drift alarm: fertility jumping means the frontier's
    * word distribution has left the vocabulary's home domain (new
    * language, new jargon, encoding damage) and every downstream token
    * budget is silently inflating.
    *
    * Unlike the batch encode (a corpus-reflexive accounting whose
    * words all carry vocab characters by construction), the stream
    * faces genuinely unseen text, so an unknown CHARACTER becomes its
    * own token at the `unkLp` floor — SentencePiece's &lt;unk&gt; rule;
    * unknown multi-char pieces just lose to their parts. Docs with no
    * letter runs contribute no row (the span monitors' rule).
    *
    * Plan shape (append-legal): a stateless word explode, the vocab
    * map attached by a constant-key stream-static equi-join (ONE
    * model-sized row), the per-word Viterbi folds in-row, then the
    * two-level aggregation — (window, id) then window — both
    * watermark-bounded. `vocab` MUST be a materialized parameter
    * table, the screen-family contract. Batch frames run the identical
    * plan, so gate and stream cannot diverge.
    */
  def windowedTokenizerFertility(docs: DataFrame, tsCol: String,
                                 idCol: String, textCol: String,
                                 vocab: DataFrame, maxPieceLen: Int = 4,
                                 unkLp: Double = -20.0,
                                 window_ : String = "1 hour",
                                 watermark: String = "10 minutes")
      : DataFrame = {
    val vmap = vocab
      .agg(map_from_entries(collect_list(
        struct(col("piece"), col("lp")))).as("__v"))
      .withColumn("__one", lit(1))
    val fwd = graft.ops.Text.viterbiForwardExpr("w", "__v", maxPieceLen,
      Some(unkLp))
    val bt = graft.ops.Text.viterbiBacktraceExpr("w", "__v", "__b",
      maxPieceLen, Some(unkLp))
    val perDoc = docs
      .withWatermark(tsCol, watermark)
      .select(col(tsCol), col(idCol),
        explode(regexp_extract_all(lower(col(textCol)),
          lit("[a-z]+"), lit(0))).as("w"),
        lit(1).as("__one"))
      .join(vmap, Seq("__one"))
      .withColumn("__b", expr(fwd))
      .select(col(tsCol), col(idCol), length(col("w")).as("__nc"),
        size(expr(bt)).as("__ns"))
      .groupBy(window(col(tsCol), window_).as("w"), col(idCol))
      .agg(count(lit(1)).as("__nw"), sum(col("__ns")).as("__nt"),
        sum(col("__nc")).as("__nch"))
    perDoc.groupBy(col("w"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("__nw")).as("n_words"),
        sum(col("__nt")).cast("long").as("n_subword_tokens"),
        sum(col("__nch")).cast("long").as("n_chars"))
      .select(col("w.start").as("window_start"), col("n_docs"),
        col("n_words"), col("n_subword_tokens"), col("n_chars"),
        round(col("n_subword_tokens").cast("double") / col("n_words"), 6)
          .as("fertility"),
        round(col("n_chars").cast("double") / col("n_subword_tokens"), 6)
          .as("chars_per_token"))
  }

  /** Streaming windowed LM BACKOFF-DEPTH monitor — the live twin of
    * [[graft.ops.Text.lmSourceReport]]: per event-time window, the
    * backoff-rung mix of the incoming stream scored against a PUBLISHED
    * [[graft.ops.Text.lmCountIndex]] (the static KenLM-style artifact).
    * The two alarms it carries: the deep-rung share (5/4-gram hits)
    * JUMPING means the stream is verbatim re-crawl of the training
    * corpus (the fluency-side crawler-loop signal); the base-rung share
    * jumping means gibberish, a new language, or an encoding break
    * entered the frontier.
    *
    * Plan shape (append-legal, the [[windowedSpanHitRate]] discipline):
    * a stateless 5-gram explode, five stream-static LEFT equi-joins
    * against the sliced index (no state — (N, V) are not needed because
    * the DEPTH never reads them), then the [[windowedDupRate]]
    * two-level aggregation — (window, id) then window, both
    * watermark-bounded. Every output is an exact integer count except
    * the two rounded share quotients; no float is ever summed across
    * rows, so the batch twin hash-checks it. `index` MUST be a
    * materialized parameter table, the screen-family contract; pass the
    * SAME `tokenizer` the index was built with (default whitespace,
    * matching [[graft.ops.Text.lmCountIndex]]'s default) — a mismatched
    * tokenizer would silently collapse every gram to depth 1.
    */
  def windowedLmDepthMix(docs: DataFrame, tsCol: String, idCol: String,
                         textCol: String, index: DataFrame,
                         window_ : String = "1 hour",
                         watermark: String = "10 minutes",
                         tokenizer: graft.ops.Text.Tokenizer =
                           graft.ops.Text.whitespaceTokenizer): DataFrame = {
    def slice(n: Int, cnt: String): DataFrame =
      index.filter(col("n") === n)
        .select((1 to n).map(j => col(s"w$j")) :+ col("c").as(cnt): _*)
    def renamed(df: DataFrame, to: Seq[String],
                keep: (String, String)): DataFrame =
      df.select(df.columns.dropRight(1).zip(to).map { case (f, t) =>
        col(f).as(t) } :+ col(keep._1).as(keep._2): _*)
    val toks = tokenizer(coalesce(col(textCol), lit("")))
    val grams = docs
      .withWatermark(tsCol, watermark)
      .select(col(tsCol), col(idCol),
        explode(transform(
          sequence(lit(1), greatest(size(toks) - 4, lit(1))),
          i => struct((1 to 5).map(j =>
            (if (j == 1) element_at(toks, i)
             else try_element_at(toks, i + (j - 1))).as(s"w$j")): _*)))
          .as("g"))
      .filter((2 to 5).map(j => col(s"g.w$j").isNotNull).reduce(_ && _))
      .select(Seq(col(tsCol), col(idCol)) ++
        (1 to 5).map(j => col(s"g.w$j").as(s"w$j")): _*)
    val hit = grams
      .join(slice(5, "c5"), Seq("w1", "w2", "w3", "w4", "w5"), "left")
      .join(renamed(slice(4, "c4"), Seq("w2", "w3", "w4", "w5"),
        "c4" -> "__c4bc"), Seq("w2", "w3", "w4", "w5"), "left")
      .join(renamed(slice(3, "c3"), Seq("w3", "w4", "w5"),
        "c3" -> "__c3cd"), Seq("w3", "w4", "w5"), "left")
      .join(renamed(slice(2, "c2"), Seq("w4", "w5"),
        "c2" -> "__c2de"), Seq("w4", "w5"), "left")
      .withColumn("__depth",
        when(col("c5").isNotNull, lit(5))
          .when(col("__c4bc").isNotNull, lit(4))
          .when(col("__c3cd").isNotNull, lit(3))
          .when(col("__c2de").isNotNull, lit(2))
          .otherwise(lit(1)))
    val perDoc = hit
      .groupBy(window(col(tsCol), window_).as("w"), col(idCol))
      .agg(count(lit(1)).as("__n"),
        sum(when(col("__depth") >= 4, 1L).otherwise(0L)).as("__deep"),
        sum(when(col("__depth") === 1, 1L).otherwise(0L)).as("__base"))
    perDoc.groupBy(col("w"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("__n")).as("n_5grams"),
        sum(col("__deep")).as("n_deep_hits"),
        sum(col("__base")).as("n_base_hits"))
      .select(col("w.start").as("window_start"), col("n_docs"),
        col("n_5grams"), col("n_deep_hits"), col("n_base_hits"),
        round(col("n_deep_hits").cast("double") / col("n_5grams"), 6)
          .as("share_deep"),
        round(col("n_base_hits").cast("double") / col("n_5grams"), 6)
          .as("share_base"))
  }

  def streamingExactDedup(docs: DataFrame, tsCol: String, textCol: String,
                          watermarkDelay: String = "10 minutes"): DataFrame = {
    val hashed = docs.withColumn("content_hash", md5(col(textCol)))
    if (hashed.isStreaming)
      hashed.withWatermark(tsCol, watermarkDelay)
        .dropDuplicatesWithinWatermark("content_hash")
    else hashed.dropDuplicates("content_hash")
  }

  /** Streaming decontamination — the stream-static twin of
    * [[graft.ops.Dedup.decontaminate]]: quarantine-tag incoming documents
    * whose token n-grams hit a STATIC eval-set shingle table (the
    * benchmark suite changes rarely; the corpus streams). Emits one
    * (id, shingle) contamination event per distinct hit — a stateless
    * stream-static LEFT SEMI equi-join, so there is no watermark, no
    * state store, and the static side is broadcast/reused per micro-batch.
    * Batch frames produce exactly the per-(id, shingle) hit set whose
    * per-id counts are the batch op's n_shared.
    */
  def streamingContamination(docs: DataFrame, idCol: String,
                             textCol: String, evalShingles: DataFrame,
                             n: Int): DataFrame =
    graft.ops.Dedup.shingles(docs, idCol, textCol, n)
      .join(evalShingles.select("shingle"), Seq("shingle"), "left_semi")

  /** Streaming SEMANTIC decontamination — the stream-static twin of
    * [[graft.ops.Dedup.decontaminateByEmbedding]]: screen each arriving
    * micro-batch of embedded documents against the frozen eval set
    * (paraphrase leakage the shingle screen cannot see). Stateless per
    * batch — the eval side is static and test-suite sized — and the
    * batch op runs untouched inside foreachBatch, so the streaming and
    * batch paths cannot diverge. Same materialization contract as
    * [[streamingMinhashScreen]]: pass a MATERIALIZED eval frame.
    */
  def streamingEmbDecontaminate(stream: DataFrame, evalSet: DataFrame,
                                idCol: String, vecCol: String,
                                threshold: Double, tables: Int,
                                planes: Int,
                                sink: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[
        org.apache.spark.sql.Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, id: Long) =>
      sink(graft.ops.Dedup.decontaminateByEmbedding(batch, evalSet,
        idCol, vecCol, threshold, tables, planes), id)
    }

  /** Streaming incremental near-dup screen — the stream-static twin of
    * [[graft.ops.Dedup.minhashLshPairsAgainstIndex]]: run the persisted
    * signature-index screen over each arriving micro-batch via
    * foreachBatch (the production shape for "apply a batch op per
    * micro-batch": signatures/banding are per-document projections and
    * the index side is static, so every batch is an independent
    * stateless screen — no watermark, no state store). Matches append to
    * `sink`; the batch op itself is untouched, so the streaming and
    * batch paths cannot diverge.
    *
    * `index` MUST be a materialized parameter table — a persisted/
    * `localCheckpoint`'d frame or a `Models.loadModel` read — exactly as
    * the batch op's contract states: foreachBatch re-evaluates the index
    * plan on EVERY micro-batch, so passing the lazy
    * `Dedup.minhashSignatures` plan would re-shingle and re-hash the
    * whole corpus per batch. Materialization is left to the caller (not
    * cached inside) because the caller owns the index's lifecycle across
    * streams and restarts.
    */
  def streamingMinhashScreen(docs: DataFrame, index: DataFrame,
                             idCol: String, textCol: String, n: Int,
                             numHashes: Int, bands: Int,
                             minEstJaccard: Double,
                             sink: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[
        org.apache.spark.sql.Row] =
    docs.writeStream.foreachBatch { (batch: DataFrame, id: Long) =>
      sink(graft.ops.Dedup.minhashLshPairsAgainstIndex(batch, index,
        idCol, textCol, n, numHashes, bands, minEstJaccard), id)
    }

  /** Streaming exact-substring screen — the live sibling of
    * [[graft.ops.Dedup.substringScreenAgainstIndex]] at
    * [[graft.ops.Dedup.substringSpanIndex]]'s granularity: every
    * arriving micro-batch is fingerprinted in-row and screened against
    * the PERSISTED span-digest index via foreachBatch (the
    * [[streamingMinhashScreen]] shape: per-document projections + a
    * static parameter-table join — stateless per batch, no watermark,
    * no state store). The crawler-loop alarm for verbatim spans: a
    * batch suddenly full of index hits is re-crawling what the corpus
    * already holds. `index` MUST be a materialized parameter table (a
    * parquet read or persisted frame) — foreachBatch re-evaluates its
    * plan every micro-batch, so a lazy fingerprint-the-corpus plan
    * would re-run per batch; the batch op is untouched inside, so the
    * streaming and batch paths cannot diverge.
    */
  def streamingSubstringScreen(docs: DataFrame, index: DataFrame,
                               idCol: String, textCol: String, k: Int,
                               sink: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[
        org.apache.spark.sql.Row] =
    docs.writeStream.foreachBatch { (batch: DataFrame, id: Long) =>
      sink(graft.ops.Dedup.substringScreenAgainstIndex(batch, index,
        idCol, textCol, k), id)
    }

  /** Streaming drift screen — the stream-static twin of
    * [[graft.ops.Drift.psiDrift]]: compute each micro-batch's PSI against
    * a STATIC reference sample (yesterday's corpus, the training
    * distribution) via foreachBatch, appending the per-bin drift frame to
    * `sink`. Stateless per batch — binning is a per-row projection and
    * the reference side is static — so no watermark and no state store;
    * the batch op itself is untouched, so the streaming and batch paths
    * cannot diverge. Same contract as [[streamingMinhashScreen]]: pass a
    * MATERIALIZED reference (persisted/localCheckpoint'd or re-read from
    * a parameter table), because foreachBatch re-evaluates the reference
    * plan every micro-batch.
    */
  def streamingDriftScreen(stream: DataFrame, reference: DataFrame,
                           valCol: String, lo: Double, hi: Double,
                           bins: Int, sink: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[
        org.apache.spark.sql.Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, id: Long) =>
      sink(graft.ops.Drift.psiDrift(batch, reference, valCol, lo, hi, bins),
        id)
    }

  /** Streaming as-of enrichment — the stream-static twin of
    * [[graft.ops.Temporal.asofJoin]]: each micro-batch of left rows picks
    * the latest right row at-or-before its timestamp from a STATIC
    * reference table (the dimension-history / quote-book shape: enrich a
    * live event stream with the most recent known state). Stateless per
    * batch — the right side is static, so no watermark or state store —
    * and the batch op runs untouched inside foreachBatch, so the
    * streaming and batch paths cannot diverge. Same materialization
    * contract as [[streamingMinhashScreen]]: pass a MATERIALIZED right
    * side (persisted/localCheckpoint'd or a parameter-table read) —
    * foreachBatch re-evaluates its plan every micro-batch.
    */
  def streamingAsofEnrich(stream: DataFrame, right: DataFrame,
                          leftKey: String, rightKey: String,
                          leftTime: String, rightTime: String,
                          payload: Seq[String], tiebreak: String,
                          sink: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[
        org.apache.spark.sql.Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, id: Long) =>
      sink(graft.ops.Temporal.asofJoin(batch, right, leftKey, rightKey,
        leftTime, rightTime, payload, tiebreak), id)
    }

  /** Streaming BM25 screen — the stream-static twin of
    * [[graft.ops.Text.bm25ScoreAgainstProfile]]: score each micro-batch
    * of incoming documents against a FROZEN [[graft.ops.Text.bm25Profile]]
    * (the standing-query alerting/routing loop: corpus statistics are a
    * parameter table, new docs never touch the corpus). Stateless per
    * batch; same materialization contract as [[streamingMinhashScreen]]
    * — pass a MATERIALIZED profile, foreachBatch re-evaluates its plan
    * every micro-batch.
    */
  def streamingBm25Screen(stream: DataFrame, profile: DataFrame,
                          idCol: String, textCol: String,
                          minScore: Double,
                          sink: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[
        org.apache.spark.sql.Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, id: Long) =>
      sink(graft.ops.Text.bm25ScoreAgainstProfile(batch, idCol, textCol,
        profile, minScore = minScore), id)
    }

  /** Streaming model scoring — the stream-static twin of
    * [[graft.ops.Models.scoreStumps]]: score each micro-batch against a
    * PUBLISHED stump-model parameter table (the online-inference loop:
    * the model is a frozen artifact, scoring is a broadcast fold, no
    * state). Stateless per batch; same materialization contract as
    * [[streamingMinhashScreen]] — pass a MATERIALIZED model frame,
    * foreachBatch re-evaluates its plan every micro-batch.
    */
  def streamingModelScore(stream: DataFrame, xCols: Seq[String],
                          model: DataFrame, lr: Double,
                          sink: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[
        org.apache.spark.sql.Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, id: Long) =>
      sink(graft.ops.Models.scoreStumps(batch, xCols, model, lr), id)
    }

  /** Streaming depth-2 model scoring — [[streamingModelScore]] for the
    * published [[graft.ops.Models.boostedTrees2]] parameter table:
    * each micro-batch folds through the frozen round-ordered tree
    * array ([[graft.ops.Models.scoreTrees2]]). Stateless per batch;
    * pass a MATERIALIZED model frame.
    */
  def streamingTrees2Score(stream: DataFrame, xCols: Seq[String],
                           model: DataFrame, lr: Double,
                           sink: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[
        org.apache.spark.sql.Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, id: Long) =>
      sink(graft.ops.Models.scoreTrees2(batch, xCols, model, lr), id)
    }

  /** Streaming ALS recommendation scoring — the serving half of
    * [[graft.ops.Models.alsFactors]]: each micro-batch of (user, item)
    * candidate pairs scores p·q against the FROZEN published factor
    * frames ([[graft.ops.Models.scoreAlsPairs]]); cold users/items
    * score NULL instead of dropping. Stateless per batch; pass
    * MATERIALIZED factor frames and re-fit on the retrain cadence.
    * Batch parity proven in StreamingSpec.
    */
  def streamingAlsScore(stream: DataFrame, userCol: String,
                        itemCol: String, userFactors: DataFrame,
                        itemFactors: DataFrame,
                        sink: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[
        org.apache.spark.sql.Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, id: Long) =>
      sink(graft.ops.Models.scoreAlsPairs(batch, userCol, itemCol,
        userFactors, itemFactors), id)
    }

  /** Streaming conformal anomaly alert — the serving half of
    * [[graft.ops.Windows.conformalInterval]]: each micro-batch of
    * (key, value) observations joins the FROZEN per-key interval table
    * and only rows OUTSIDE [lo, hi] flow to the sink — a
    * distribution-free anomaly feed whose false-alarm rate is bounded
    * by the interval's alpha, no Gaussian assumption. Stateless per
    * batch; pass a MATERIALIZED interval frame (re-fit it on whatever
    * cadence the series drifts). The batch twin is the identical
    * join+filter on a static frame — proven in StreamingSpec.
    */
  def streamingConformalAlert(stream: DataFrame, intervals: DataFrame,
                              keyCol: String, valCol: String,
                              sink: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[
        org.apache.spark.sql.Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, id: Long) =>
      sink(conformalOutliers(batch, intervals, keyCol, valCol), id)
    }

  /** The shared batch body of [[streamingConformalAlert]]: observations
    * outside their key's [lo, hi] conformal band, with the band and
    * the signed excess attached.
    */
  def conformalOutliers(obs: DataFrame, intervals: DataFrame,
                        keyCol: String, valCol: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val v = col(valCol).cast("double")
    obs.join(broadcast(intervals.select(col(keyCol), col("lo"),
        col("hi"))), Seq(keyCol))
      .filter(v < col("lo") || v > col("hi"))
      .withColumn("excess",
        round(when(v > col("hi"), v - col("hi"))
          .otherwise(v - col("lo")), 6))
  }

  /** Streaming ANN serving — the stream-static twin of
    * [[graft.ops.Similarity.pqQueryIndex]]: score each micro-batch of
    * query vectors against a FROZEN published
    * [[graft.ops.Similarity.PqIndex]] (the standing-similarity-query
    * loop: the index is a persisted artifact — four parquet frames —
    * and serving a batch touches raw corpus vectors only for the
    * k·refine shortlist). Stateless per batch; same materialization
    * contract as [[streamingMinhashScreen]] — pass MATERIALIZED index
    * frames, foreachBatch re-evaluates the plan every micro-batch.
    */
  def streamingPqScore(stream: DataFrame,
                       index: graft.ops.Similarity.PqIndex,
                       corpus: DataFrame, idCol: String, vecCol: String,
                       k: Int, nprobe: Int, refine: Int,
                       sink: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[
        org.apache.spark.sql.Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, id: Long) =>
      sink(graft.ops.Similarity.pqQueryIndex(index, corpus, batch,
        idCol, vecCol, k, nprobe, refine), id)
    }

  /** Stream-STREAM interval join — the two-live-feeds shape (clicks ×
    * impressions, orders × payments): left rows pair with right rows of
    * the same key whose event time falls in [leftTime − lag, leftTime].
    * Both sides carry watermarks, and the time-range predicate is what
    * lets the engine BOUND the join state: each side buffers only rows
    * inside watermark + lag, then evicts — without the interval
    * condition a stream-stream join would buffer forever. The batch twin
    * is the identical expression applied to static frames (same function
    * — the join predicate, not the runner, defines the semantics), which
    * is how StreamingSpec proves stream ≡ batch.
    *
    * Columns are prefixed (`l_`/`r_`) before the join so the caller's
    * two schemas can never collide inside the condition.
    */
  def intervalJoin(left: DataFrame, right: DataFrame,
                   key: String, leftTime: String, rightTime: String,
                   lagSec: Long, watermarkSec: Long = 60L): DataFrame = {
    require(lagSec >= 0, "intervalJoin needs lagSec >= 0")
    val l = left.columns.foldLeft(left) { (d, c) =>
        d.withColumnRenamed(c, s"l_$c")
      }.withWatermark(s"l_$leftTime", s"$watermarkSec seconds")
    val r = right.columns.foldLeft(right) { (d, c) =>
        d.withColumnRenamed(c, s"r_$c")
      }.withWatermark(s"r_$rightTime", s"$watermarkSec seconds")
    l.join(r,
      col(s"l_$key") === col(s"r_$key") &&
        col(s"r_$rightTime") >= col(s"l_$leftTime") -
          expr(s"INTERVAL $lagSec SECONDS") &&
        col(s"r_$rightTime") <= col(s"l_$leftTime"))
  }

  case class Event(event_id: Long, ts: Timestamp, user_id: Long,
                   event_type: String, value: Double)

  case class SessionState(start: Long, lastSeen: Long, nEvents: Long,
                          totalValue: Double)

  case class FirstSeen(user_id: Long, first_ts: Timestamp)

  case class Session(user_id: Long, session_start: Timestamp,
                     session_end: Timestamp, n_events: Long,
                     total_value: Double)

  /** Stateful sessionization: per-user sessions close after `gapMs` of
    * EVENT-TIME inactivity — either because a later event for the key
    * arrives beyond the gap, or because the event-time timeout fires once
    * the WATERMARK passes lastSeen + gapMs (the open session is then
    * emitted and its state removed — bounded state, and no dependence on
    * wall-clock batch pacing: a lagging or replayed stream produces the
    * same sessions as the batch twin).
    */
  def sessionize(events: Dataset[Event], gapMs: Long,
                 watermarkDelay: String = "10 minutes"): Dataset[Session] = {
    import events.sparkSession.implicits._
    // captured by the state function: batch execution has no watermark, so
    // timeout scheduling (a no-op there anyway) must be skipped — reading
    // getCurrentWatermarkMs without one throws
    val isStreaming = events.isStreaming
    val withWm =
      if (isStreaming)
        events.toDF().withWatermark("ts", watermarkDelay).as[Event]
      else events
    withWm.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (userId, rows, state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            // idle key: close and emit whatever session is open
            val out = state.getOption.map(s =>
              Session(userId, new Timestamp(s.start),
                new Timestamp(s.lastSeen), s.nEvents, s.totalValue))
            state.remove()
            out.iterator
          } else {
            val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            var cur = state.getOption
            val closed = Seq.newBuilder[Session]
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.lastSeen <= gapMs =>
                  cur = Some(s.copy(lastSeen = t, nEvents = s.nEvents + 1,
                    totalValue = s.totalValue + e.value))
                case Some(s) =>
                  closed += Session(userId, new Timestamp(s.start),
                    new Timestamp(s.lastSeen), s.nEvents, s.totalValue)
                  cur = Some(SessionState(t, t, 1, e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // event-time timeout: fire when the watermark passes the
              // session gap (must stay above the current watermark)
              if (isStreaming)
                state.setTimeoutTimestamp(math.max(s.lastSeen + gapMs,
                  state.getCurrentWatermarkMs() + 1))
            }
            closed.result().iterator
          }
      }
  }

  /** Batch twin of [[sessionize]] as a pure window computation — the
    * gaps-and-islands form: a session starts where the event-time gap to
    * the previous event of the key exceeds `gapMs`; the running sum of
    * start flags numbers the sessions. One shuffle on the user key, fully
    * parallel, and exactly the session set the stateful streaming operator
    * emits over a complete replay (closed + open) — which is what makes
    * the streaming surface hash-checkable against a SQL oracle.
    */
  def sessionCounts(events: DataFrame, gapMs: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .withColumn("__prev", lag(col("ts"), 1).over(w))
      .withColumn("__new", when(col("__prev").isNull ||
        unix_millis(col("ts")) - unix_millis(col("__prev")) > gapMs, 1L)
        .otherwise(0L))
      .withColumn("session_idx", sum(col("__new")).over(wRun))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"),
        // 2-decimal TOTAL, not mean: boundary-safe under any partial-sum
        // order (see windowedRates)
        round(sum(col("value")), 2).as("total_value"))
      .orderBy("user_id", "session_idx")
  }

  /** Flush any open sessions currently held in state — batch-mode helper so
    * tests and backfills can account for every event.
    */
  def openSessions(events: Dataset[Event], gapMs: Long): Dataset[Session] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id).mapGroups { (userId, rows) =>
      val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
      var last = Long.MinValue
      var start = 0L
      var n = 0L
      var total = 0.0
      sorted.foreach { e =>
        val t = e.ts.getTime
        if (last == Long.MinValue || t - last > gapMs) {
          start = t; n = 0; total = 0.0
        }
        last = t; n += 1; total += e.value
      }
      Session(userId, new Timestamp(start), new Timestamp(last), n, total)
    }
  }

  /** Streaming first-seen — the stateful twin of
    * [[graft.ops.Events.cumulativeUsers]]'s first-seen derivation: emit
    * exactly ONE (user, first_ts) row per user, on the first micro-batch
    * the user appears in (within that batch, the (ts, event_id)-least
    * event wins — deterministic under any batch-internal order). The
    * downstream audience curve is a plain day rollup + running sum over
    * the emitted rows.
    *
    * State honesty: one boolean-sized entry per EVER-SEEN user with NO
    * timeout — the audience metric semantically requires ever-seen
    * memory, so this is the minimal possible state (contrast
    * [[streamingExactDedup]], where a watermark legitimately bounds
    * state because re-emission of ancient duplicates is acceptable
    * there). Batch execution degrades to one row per user keyed by the
    * (ts, event_id) minimum — identical to the batch twin when the
    * stream delivers events in event-time order; an out-of-order
    * arrival CAN pin first_ts to the arrival-order first (the price of
    * answering from a stream), which is why the gate stays on the batch
    * op and this twin is StreamingSpec-verified.
    */
  def firstSeen(events: Dataset[Event]): Dataset[FirstSeen] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[Byte, FirstSeen](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (userId, rows, state: GroupState[Byte]) =>
          if (state.exists) Iterator.empty
          else {
            val first = rows.minBy(e => (e.ts.getTime, e.event_id))
            state.update(1.toByte)
            Iterator(FirstSeen(userId, first.ts))
          }
      }
  }
}
