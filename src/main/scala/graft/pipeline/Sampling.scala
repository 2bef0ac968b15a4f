package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling operators for training-mix construction.
  *
  * A pipeline that mixes N corpora at fixed rates ("50% web, 25% code,
  * 1% transcripts") needs sampling that is (a) reproducible across runs
  * and engines, (b) independent of partition layout and task retries, and
  * (c) a narrow map-side filter so it composes with column pruning and
  * partition pruning at 100 TB. `rand()`-per-row sampling fails (a) and
  * (b): the keep-set changes with the partition layout, a retried task
  * re-rolls its rows, and no other system can reproduce the choice.
  * Keying the decision on arithmetic over a stable id column fails none:
  * the keep-set is a pure function of the data.
  *
  * The bucket function is a 32-bit LCG (the classic glibc constants)
  * evaluated in 64-bit integer arithmetic: `((id mod 2^32) * 1103515245
  * + 12345) mod 2^32` with `mod` = Spark's `pmod` (non-negative result).
  * Chosen over xxhash64/crc32 deliberately: the SAME arithmetic is
  * expressible verbatim in any ANSI SQL engine, and statistical quality
  * beyond rate-accuracy is irrelevant here — ids are assigned, not
  * adversarial. The inner mod keeps every intermediate below 2^63 for
  * any Long id (max (2^32-1) * 1103515245 ≈ 4.7e18). NB for porting:
  * SQL `%` is sign-preserving, so the portable formula for ids that may
  * be negative (hash-derived ids!) normalizes at the end —
  * `((((id % m) * 1103515245 + 12345) % m) + m) % m` with m = 2^32 —
  * which equals pmod's result for every Long id; the gate oracle uses
  * exactly this form.
  */
object Sampling {
  private val Mod = 4294967296L // 2^32

  /** Keep-bucket in [0, 2^32) for a stable integral id column. A NULL id
    * yields a NULL bucket, which fails every `<` comparison — so
    * null-id rows are silently excluded from every sample and every
    * split, the same answer a SQL engine gives for the oracle formula.
    */
  def lcgBucket(id: Column): Column =
    pmod(pmod(id, lit(Mod)) * lit(1103515245L) + lit(12345L), lit(Mod))

  /** Integer keep-cutoff for a [0,1] rate: rows keep iff bucket < cutoff.
    * Exposed so an external oracle can embed the identical literal.
    */
  def rateCutoff(rate: Double): Long = (rate * Mod).toLong

  /** Keep each row iff its stratum's rate admits the row's bucket
    * (`lcgBucket(id) < rate * 2^32`). `rates` maps stratum value to a
    * [0,1] keep rate; strata not listed get `defaultRate`. One projection
    * + filter, no shuffle, no state: at 100 TB this runs entirely
    * map-side, and the per-stratum rates can be retuned without touching
    * previously sampled data (a row's fate depends only on its id and
    * its stratum's rate — growing a rate strictly grows the keep-set,
    * which is what iterative mix tuning wants).
    */
  def hashStratifiedSample(
      df: DataFrame,
      idCol: String,
      strataCol: String,
      rates: Map[String, Double],
      defaultRate: Double = 0.0): DataFrame = {
    require((rates.values ++ Seq(defaultRate)).forall(r => r >= 0.0 && r <= 1.0),
      s"rates must be in [0,1], got $rates default $defaultRate")
    val cutoff = rates.foldLeft(lit(rateCutoff(defaultRate))) {
      case (acc, (k, r)) => when(col(strataCol) === k, lit(rateCutoff(r))).otherwise(acc)
    }
    df.filter(lcgBucket(col(idCol)) < cutoff)
  }

  /** Unstratified variant: one global rate. */
  def hashSample(df: DataFrame, idCol: String, rate: Double): DataFrame = {
    require(rate >= 0.0 && rate <= 1.0, s"rate must be in [0,1], got $rate")
    df.filter(lcgBucket(col(idCol)) < lit(rateCutoff(rate)))
  }

  /** Per-source keep rates that realize a target training MIXTURE within
    * a token budget: source s gets rate
    * `min(1, share_s * budget / tokens_s)` — the fraction of its corpus
    * that fills its slice of the budget. Sources absent from
    * `targetShares` get 0 (excluded). A source with fewer tokens than
    * its allocation caps at rate 1 and UNDER-delivers its share (the
    * standard downsampling-only mix; upsampling is epoch repetition, a
    * training-loop concern, not a corpus operator). One aggregation over
    * the corpus; the returned map is driver-sized (#distinct sources in
    * the targets).
    */
  def mixRates(
      df: DataFrame,
      sourceCol: String,
      tokenCount: Column,
      targetShares: Map[String, Double],
      totalTokenBudget: Double): Map[String, Double] = {
    require(targetShares.values.forall(s => s >= 0.0 && s <= 1.0) &&
      targetShares.values.sum <= 1.0 + 1e-9,
      s"shares must be in [0,1] and sum <= 1, got $targetShares")
    val totals = df.groupBy(col(sourceCol))
      .agg(sum(tokenCount.cast("long")).as("tok"))
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap
    targetShares.map { case (s, share) =>
      val tokens = totals.getOrElse(s, 0L)
      s -> (if (tokens <= 0L) 0.0
            else math.min(1.0, (share * totalTokenBudget) / tokens.toDouble))
    }
  }

  /** Mixture balancing: deterministically subsample each source to its
    * [[mixRates]] keep rate — the "rebalance N corpora to a target
    * training mix" operator. Composes the one-aggregation rate
    * computation with [[hashStratifiedSample]]'s map-side id filter:
    * at 100 TB the corpus is scanned once to size the sources and once
    * (narrow, prunable) to emit the mix; nothing shuffles. Same
    * reproducibility contract as every LCG sampler here: the keep-set
    * is a pure function of (id, rates), so retuning shares only
    * grows/shrinks each source's sample monotonically.
    */
  def mixToBudget(
      df: DataFrame,
      idCol: String,
      sourceCol: String,
      tokenCount: Column,
      targetShares: Map[String, Double],
      totalTokenBudget: Double): DataFrame =
    hashStratifiedSample(df, idCol, sourceCol,
      mixRates(df, sourceCol, tokenCount, targetShares, totalTokenBudget))

  /** Deterministic disjoint splits (train/val/test, data mixes): row i of
    * the result holds the rows whose bucket falls in the i-th cumulative
    * half-open interval of `fractions` (which must sum to <= 1; any
    * remainder is simply in no split). Split membership is a pure
    * function of the id — reproducible across runs, engines, partition
    * layouts, and retries — and CONSISTENT with [[hashSample]]: a 10%
    * `hashSample` equals the first split of `hashSplit(df, id,
    * Seq(0.1, ...))`, so a pipeline can carve validation data out of the
    * exact sample it trained on. Each split is still a pure map-side
    * filter over the base frame.
    */
  /** Leakage-free splits: like [[hashSplit]], but near-duplicate
    * CLUSTERS travel together — a doc's split is decided by its
    * component id (from [[Dedup.connectedComponents]] over the near-dup
    * pair graph) instead of its own id, so a train/test split can never
    * put two near-duplicates on opposite sides (the classic eval-leak:
    * the model is tested on a paraphrase of a training doc).
    *
    * `components` is the (id, component) frame of the PAIRED docs only;
    * unpaired docs (the overwhelming majority) fall back to their own id
    * — for them this is exactly [[hashSplit]], so existing mixes only
    * reshuffle where clusters demand it. Component ids are min reachable
    * doc ids, so membership stays a pure function of the data.
    *
    * Scale shape: one join against the pair-graph-sized component map
    * (broadcast when it fits — near-dup graphs are corpus-fraction
    * sized; a shuffle join on the 8-byte id otherwise), then the same
    * map-side LCG filters as every sampler here.
    */
  def leakageFreeSplit(
      df: DataFrame,
      idCol: String,
      components: DataFrame,
      fractions: Seq[Double]): Seq[DataFrame] = {
    val comps = components.select(col("id").as(idCol), col("component"))
    val keyed = df
      .join(comps, Seq(idCol), "left")
      .withColumn("__split_key", coalesce(col("component"), col(idCol)))
    splitByKey(keyed, col("__split_key"), fractions)
      .map(_.drop("component", "__split_key"))
  }

  private def splitByKey(
      df: DataFrame,
      key: Column,
      fractions: Seq[Double]): Seq[DataFrame] = {
    require(fractions.nonEmpty && fractions.forall(f => f >= 0.0 && f <= 1.0),
      s"fractions must each be in [0,1], got $fractions")
    require(fractions.sum <= 1.0 + 1e-9, s"fractions must sum to <= 1, got ${fractions.sum}")
    // snap a near-1 FINAL cumulative sum to exactly 1: Seq(0.7, 0.2, 0.1)
    // sums to 0.9999999999999999 in doubles, and without the snap the last
    // cut is 2^32 - 1 — a row whose bucket is exactly that value (a
    // preimage exists for every bucket; the LCG multiplier is odd, hence
    // invertible mod 2^32) would fall in NO split despite fully covering
    // fractions. Only the LAST sum is snapped: an intermediate sum that
    // legitimately sits within 1e-9 of 1 (e.g. Seq(1.0 - 1e-10, 1e-10))
    // must keep its exact cut or every later split collapses to empty.
    val sums = fractions.scanLeft(0.0)(_ + _)
    val cuts = sums.zipWithIndex.map { case (f, i) =>
      if (i == sums.length - 1 && f >= 1.0 - 1e-9) 1.0 else math.min(f, 1.0)
    }.map(rateCutoff)
    fractions.indices.map { i =>
      val b = lcgBucket(key)
      df.filter(b >= lit(cuts(i)) && b < lit(cuts(i + 1)))
    }
  }

  def hashSplit(df: DataFrame, idCol: String, fractions: Seq[Double]): Seq[DataFrame] =
    splitByKey(df, col(idCol), fractions)

  /** Curriculum ordering: bucket rows into `nBuckets` score quantiles
    * (bucket 0 = lowest scores) and give every row a deterministic
    * training position — `(bucket, lcgBucket(id), id)` ascending — so an
    * easy-to-hard (or hard-to-easy: reverse the bucket) curriculum is a
    * pure sort key, reproducible across runs and engines, with the
    * within-bucket LCG shuffle breaking any correlation between score
    * rank and corpus order. Returns the input plus
    * `(bucket, pos_in_bucket)`.
    *
    * Bucketing is `ntile` over the total order `(score, id)` — the tie
    * rule makes bucket boundaries exact, not plan-dependent. The window
    * is one global sort (ntile needs global ranks); at 100 TB compute
    * the score-quantile CUTS on a sample or with approxQuantile instead
    * and bucket by comparison (map-side) — this exact variant is the
    * oracle-able contract those approximations converge to.
    */
  def curriculumOrder(
      df: DataFrame,
      scoreCol: String,
      idCol: String,
      nBuckets: Int): DataFrame = {
    require(nBuckets > 0, s"nBuckets=$nBuckets must be positive")
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy(col(scoreCol).asc, col(idCol).asc)
    val wb = Window.partitionBy("bucket")
      .orderBy(lcgBucket(col(idCol)).asc, col(idCol).asc)
    df.withColumn("bucket", (ntile(nBuckets).over(w) - 1).cast("long"))
      .withColumn("pos_in_bucket", (row_number().over(wb) - 1).cast("long"))
  }

  /** The 100 TB curriculum shape [[curriculumOrder]]'s scaladoc
    * promises, shipped (r14): bucket by COMPARISON against
    * caller-precomputed ascending score cuts (from `approxQuantile` or
    * a sample — a driver-sized Seq), entirely map-side: no window, no
    * shuffle, no global sort anywhere in the operator. Returns the
    * input plus `bucket` (= number of cuts strictly below the score,
    * so `cuts.size + 1` buckets; null scores land in bucket 0 with the
    * lowest) and `shuffle_key` (the within-bucket LCG position).
    * Sorting or [[rangeShards]]-sharding by `(bucket, shuffle_key, id)`
    * lays the corpus easy→hard with the same decorrelated within-bucket
    * order [[curriculumOrder]] produces — that exact-ntile variant
    * remains the oracle-able contract these cuts converge to as the
    * quantile estimate tightens, and `p_curriculum_cuts` pins THIS
    * operator's arithmetic (bucket comparisons + LCG) independently.
    */
  def curriculumByCuts(
      df: DataFrame,
      scoreCol: String,
      idCol: String,
      cuts: Seq[Double]): DataFrame = {
    require(cuts.nonEmpty, "cuts must be non-empty")
    require(cuts == cuts.sorted && cuts.distinct == cuts,
      s"cuts must be strictly ascending, got $cuts")
    val bucket = cuts.foldLeft(lit(0L)) { (acc, c) =>
      acc + when(col(scoreCol) > lit(c), 1L).otherwise(0L)
    }
    df.withColumn("bucket", bucket)
      .withColumn("shuffle_key", lcgBucket(col(idCol)))
  }

  /** Exactly `min(k, |group|)` ids per group, deterministically
    * pseudo-uniform: rows rank by `(lcgBucket(id), id)` and the k
    * smallest win. Rate-based samplers ([[hashSample]]) only hit k IN
    * EXPECTATION — fixed-size eval subsets, per-source audit samples,
    * and "exactly 1000 docs per domain" asks need the exact-k shape.
    *
    * Implemented with the bounded-heap `topk_by_score` aggregate, so
    * each map task forwards at most k candidates per group and the
    * shuffle carries O(groups x k) rows — never a per-group sort of the
    * full corpus (the `row_number()` window plan). Same determinism
    * contract as every LCG sampler here: the pick set is a pure function
    * of the ids, independent of partitioning and engine.
    */
  /** Per-epoch shuffle coordinates: every row gets a deterministic
    * `(shard, sort_key)` for training epoch `epoch` — the distributed
    * answer to "globally shuffle 100 TB before every epoch", which a
    * real global sort-by-random cannot be (one total-order sort per
    * epoch, and `rand()` breaks retry reproducibility). The consumer
    * writes `repartition(numShards, col("shard"))` +
    * `sortWithinPartitions("sort_key", idCol)` — one shuffle whose keys
    * are 8-byte integers, no global ordering anywhere.
    *
    * `shard` takes the HIGH bits of the epoch-salted LCG bucket
    * (`bucket * numShards div 2^32`) — LCG low bits cycle with short
    * periods, so a `% numShards` shard would stripe — and `sort_key`
    * re-applies the LCG to the bucket for a decorrelated within-shard
    * order (ties broken by id at the sort site). Both are pure
    * arithmetic over (id, epoch): reproducible across runs, engines,
    * partition layouts, and retries, and epochs permute independently
    * (the salt moves every id to an unrelated bucket). Map-side only —
    * composes with column pruning; nothing shuffles until the consumer's
    * single repartition.
    */
  def epochShards(
      df: DataFrame,
      idCol: String,
      epoch: Int,
      numShards: Int): DataFrame = {
    require(numShards > 0, s"numShards=$numShards must be positive")
    // bucket * numShards must stay exactly representable in the double
    // that floor() divides (< 2^53): 2^32 * 2^20 = 2^52. A million
    // shards is far past any real training job.
    require(numShards <= (1 << 20), s"numShards=$numShards exceeds 2^20")
    require(epoch >= 0, s"epoch=$epoch must be non-negative")
    // The epoch enters by XOR, not addition: the LCG is affine, so an
    // ADDITIVE salt only rotates every bucket by the same constant
    // (lcg(x+c) = lcg(x) + A*c mod m) — epochs would be shard ROTATIONS
    // of each other, preserving every neighborhood. XOR with the
    // Knuth-constant stride is non-affine over Z_2^32, so consecutive
    // epochs genuinely re-permute (empirically P(same shard) ~ 1/S,
    // pinned in the suite). The id is reduced mod 2^32 first; XOR never
    // overflows, so any Long id and epoch are safe under ANSI arithmetic.
    val idm = pmod(col(idCol), lit(Mod))
    val salted = lcgBucket(idm.bitwiseXOR(lit(epoch.toLong * 2654435761L)))
    df
      .withColumn("shard",
        floor(salted * lit(numShards.toLong) / lit(Mod)).cast("long"))
      .withColumn("sort_key", lcgBucket(salted + idm))
  }

  /** Temperature-based mixture rates (the multilingual rebalancing rule
    * of XLM-R / mT5): group `l` with `n_l` of `N` docs is sampled with
    * probability `q_l ∝ (n_l/N)^alpha`, flattening the distribution as
    * `alpha → 0` so low-resource groups are up-weighted. Returns one row
    * per group — `(group, n_docs, rate)` — where `rate = budget·q_l/n_l`
    * is the per-doc EXPECTED COPY COUNT hitting a total budget of
    * `budget` docs (rate > 1 means low-resource upsampling, i.e.
    * duplication; cap with `maxRate` to bound repetition à la mT5).
    *
    * Cross-engine determinism: `pow` is snapped to 6 dp the moment it is
    * computed and the normalizer sums those snapped weights as DECIMAL
    * (order-independent — a double sum over groups would depend on
    * engine visit order); the final rate is 6dp-snapped with a fixed
    * association order `(budget * q) / n_docs`.
    *
    * Scale shape: one corpus scan collapsing map-side to #groups rows;
    * everything after is group-table arithmetic (#groups ≈ languages or
    * sources — tiny), broadcast back by [[temperatureSample]].
    */
  def temperatureRates(
      docs: DataFrame,
      groupCol: String,
      alpha: Double,
      budget: Long,
      maxRate: Double = Double.MaxValue): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha=$alpha must be in (0, 1]")
    require(budget > 0, s"budget=$budget must be positive")
    require(maxRate > 0, s"maxRate=$maxRate must be positive")
    val counts = docs.groupBy(col(groupCol).as("grp"))
      .agg(count(lit(1)).as("n_docs"))
    val tot = counts.agg(sum(col("n_docs")).cast("long").as("n_total"))
    val w = round(pow(col("n_docs").cast("double") /
      col("n_total").cast("double"), alpha), 6).cast("decimal(18,6)")
    val weighted = counts.crossJoin(broadcast(tot)).withColumn("w", w)
    val wsum = weighted.agg(sum(col("w")).as("w_sum"))
    weighted
      .crossJoin(broadcast(wsum))
      .withColumn("q", col("w").cast("double") / col("w_sum").cast("double"))
      .withColumn("rate",
        least(round(lit(budget.toDouble) * col("q") / col("n_docs").cast("double"), 6),
          lit(maxRate)))
      .select(col("grp").as(groupCol), col("n_docs"), col("rate"))
  }

  /** Apply [[temperatureRates]] to the corpus: every doc gets its
    * group's `rate` and a deterministic `n_copies = floor(rate) +
    * (lcg(id) < frac(rate)·2^32)` — the integer-threshold Bernoulli on
    * the fractional part rides the same LCG contract as every sampler
    * here, so the copy set is a pure function of (id, rates),
    * reproducible across engines, layouts, and retries. Zero-copy rows
    * are KEPT (n_copies = 0) — the caller drops or accounts for them;
    * [[materializeCopies]] explodes to one row per copy. The rate table
    * is #groups-sized and broadcast: the corpus never shuffles.
    */
  def temperatureSample(
      docs: DataFrame,
      groupCol: String,
      idCol: String,
      alpha: Double,
      budget: Long,
      maxRate: Double = Double.MaxValue): DataFrame =
    applyRates(docs, groupCol, idCol,
      temperatureRates(docs, groupCol, alpha, budget, maxRate))

  /** Apply a PRECOMPUTED `(group, rate)` table — the deployment shape:
    * rates come from yesterday's corpus profile (or a policy file) and
    * today's batch, or a STREAM, is stamped against them. Stateless:
    * one broadcast stream-static join plus map arithmetic, so the same
    * call runs verbatim in Structured Streaming append mode
    * (StreamingSuite parity-pins it against the batch path).
    */
  def applyRates(
      docs: DataFrame,
      groupCol: String,
      idCol: String,
      rates: DataFrame): DataFrame = {
    val base = floor(col("rate")).cast("long")
    val thr = floor((col("rate") - floor(col("rate"))) * lit(Mod)).cast("long")
    docs
      .join(broadcast(rates.select(col(groupCol), col("rate"))), Seq(groupCol))
      .withColumn("n_copies",
        base + when(lcgBucket(col(idCol)) < thr, lit(1L)).otherwise(lit(0L)))
  }

  /** One output row per copy: `(…, copy_idx)` with `copy_idx` in
    * `[1, n_copies]`; `n_copies = 0` rows vanish. Map-side only —
    * `sequence(1, n)` explodes a long array whose total size is the
    * sampled budget, not the corpus.
    */
  def materializeCopies(df: DataFrame, copiesCol: String = "n_copies"): DataFrame =
    // NB sequence(1, 0) in Spark is the DESCENDING [1, 0], not empty —
    // zero-copy rows must be guarded to an empty array explicitly
    df.withColumn("copy_idx",
        explode(when(col(copiesCol) >= 1, sequence(lit(1L), col(copiesCol)))
          .otherwise(array().cast("array<bigint>"))))
      .drop(copiesCol)

  /** Token-budget waterfilling across sources — the allocation half of
    * a training-mix design when NO target shares are given (for given
    * shares, see [[mixRates]]): every source keeps its full demand up to
    * a common cap `t`, with `t` set so the total exactly meets `budget`
    * (`alloc_s = min(n_s, t)`, Σ alloc = min(budget, Σ n)). This is the
    * classic max-min-fair allocation: small sources are untouched,
    * oversized sources are clipped to the same ceiling — "no domain may
    * dominate the mix" as an algorithm instead of hand-tuned shares.
    *
    * All-integer contract: sources sort by (n_tokens asc, source asc);
    * source i saturates iff `n_i · (m − i + 1) <= budget − prefix_{i−1}`
    * (cross-multiplied — saturation is prefix-closed in this order, so
    * the test needs no search); unsaturated sources split the residual
    * as `cap = residual div (m − s)` with the `residual mod (m − s)`
    * leftover tokens going one each to the LARGEST-demand sources
    * (deterministic tie order). No floats anywhere: two engines cannot
    * disagree, and Σ alloc hits the budget EXACTLY, not ±rounding.
    *
    * Returns `(source, n_tokens, alloc, saturated)`. Feed `alloc /
    * n_tokens` rates to [[hashStratifiedSample]] (or `alloc` itself to a
    * token-packing stage) to materialize the mix.
    *
    * Scale shape: the input is the per-source AGGREGATE table (the
    * corpus itself was collapsed by the upstream groupBy — this operator
    * never sees documents). The sort window runs single-partition over
    * #sources rows; web-scale source tables are ~1e7 narrow rows — fine
    * for one task. Beyond that, the range-partitioned prefix-sum used by
    * the distributed weighted quantile applies verbatim.
    */
  def tokenBudgetWaterfill(
      demand: DataFrame,
      sourceCol: String,
      tokensCol: String,
      budget: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(budget >= 0L, s"budget must be >= 0, got $budget")
    val w = Window.orderBy(col("n_tokens").asc, col(sourceCol).asc)
    val base = demand.select(col(sourceCol),
      col(tokensCol).cast("long").as("n_tokens"))
    val ordered = base
      .withColumn("idx", row_number().over(w).cast("long"))
      .withColumn("prefix", sum(col("n_tokens"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val mDf = base.agg(count(lit(1)).as("m"))
    val sat = ordered.crossJoin(broadcast(mDf))
      .withColumn("saturated",
        (col("n_tokens") * (col("m") - col("idx") + 1) <=
          lit(budget) - (col("prefix") - col("n_tokens"))).cast("long"))
    val satAgg = sat.agg(
      sum(col("saturated")).as("s"),
      coalesce(sum(when(col("saturated") === 1, col("n_tokens"))), lit(0L)).as("ps"))
    // cap/remainder via integral `div`/pmod (never double division —
    // exact past 2^53); the CaseWhen keeps the whole residual branch
    // unevaluated when every source saturated (m = s would divide by 0)
    sat.crossJoin(broadcast(satAgg))
      .withColumn("alloc",
        when(col("saturated") === 1, col("n_tokens"))
          .otherwise(
            expr(s"(${budget}L - ps) div (m - s)") +
              when(col("idx") > col("m") -
                pmod(lit(budget) - col("ps"), col("m") - col("s")), lit(1L))
                .otherwise(lit(0L))))
      .select(col(sourceCol), col("n_tokens"), col("alloc"), col("saturated"))
  }

  def exactKPerGroup(
      df: DataFrame,
      groupCol: String,
      idCol: String,
      k: Int): DataFrame = {
    import org.apache.spark.sql.graft.TopKByScore.topk_by_score
    require(k > 0, s"k=$k must be positive")
    df
      .groupBy(col(groupCol))
      .agg(topk_by_score(
        col(idCol), -lcgBucket(col(idCol)).cast("double"), k).as("picks"))
      .select(col(groupCol), explode(col("picks")).as("p"))
      .select(col(groupCol), col("p.id").as(idCol))
  }

  /** Range sharding by exact key quantiles: boundaries are the (1/R ...
    * (R-1)/R) percentiles of `keyCol` ((n-1)·p interpolation, the
    * Spark/DuckDB-shared formula), and `shard_id` = number of boundaries
    * strictly below the key — ties at a boundary all land in the lower
    * shard, deterministically, with no row sampling anywhere. This is the
    * write-side twin of `repartitionByRange` (whose boundaries come from
    * a nondeterministic reservoir sample): sorted, roughly equal shards
    * make parquet zone maps (min/max) prune range scans, the layout a
    * time- or length-keyed corpus wants on disk.
    *
    * Scale shape: one percentile aggregate (map-side partial, R-1 output
    * doubles), then a broadcast of that single boundary row and a
    * map-side `aggregate()` comparison per row — no shuffle of the data
    * itself (writers then `repartition(shard_id)` or partitionBy as
    * needed). At 100 TB swap the exact percentile for `approx_percentile`
    * and the semantics keep: ANY monotone boundary vector yields a valid
    * range partitioning; boundary quality affects balance, not
    * correctness. NULL keys compare false against every boundary and
    * land in shard 0.
    */
  def rangeShards(df: DataFrame, keyCol: String, numShards: Int): DataFrame = {
    require(numShards >= 2, s"numShards=$numShards must be >= 2")
    val ps = (1 until numShards).map(_.toDouble / numShards)
    val bounds = df.agg(
      percentile(col(keyCol).cast("double"), typedLit(ps)).as("bs"))
    df.crossJoin(broadcast(bounds))
      .withColumn("shard_id", shardByBounds(col(keyCol), col("bs")))
      .drop("bs")
  }

  /** [[rangeShards]] against a PRECOMPUTED boundary vector: the serving
    * seam. Boundaries come from yesterday's corpus (or an
    * `approx_percentile` pass) as R-1 plain doubles; assignment is a pure
    * stateless projection, so the same call shards a STREAM verbatim
    * (suite-pinned parity) and incremental batches route into the
    * existing layout without re-deriving cuts. Monotonicity of `bounds`
    * is the caller's contract (fail-loud checked).
    */
  def rangeShardsWithBounds(
      df: DataFrame,
      keyCol: String,
      bounds: Seq[Double]): DataFrame = {
    require(bounds.nonEmpty, "bounds must be non-empty")
    require(bounds.zip(bounds.tail).forall { case (a, b) => a <= b },
      s"bounds must be non-decreasing: $bounds")
    df.withColumn("shard_id",
      shardByBounds(col(keyCol), typedLit(bounds)))
  }

  /** Shared assignment rule: count of boundaries strictly below the key
    * (NULL keys fail every comparison and land in shard 0).
    */
  private def shardByBounds(key: Column, bounds: Column): Column =
    aggregate(bounds, lit(0),
      (acc, bv) => acc + when(key.cast("double") > bv, 1).otherwise(0))

  /** Z-order (Morton) key: interleave the low `bits` bits of two
    * non-negative integer columns — `a`'s bit i lands at position 2i,
    * `b`'s at 2i+1 — so sorting by the key clusters rows that are close
    * in BOTH dimensions. This is the multi-column layout technique
    * (Delta `ZORDER BY`, Iceberg z-ordering) that single-column
    * [[rangeShards]] cannot express: range-sort by `a` gives perfect
    * zone-map pruning on `a` and none on `b`; z-order gives ~√-quality
    * pruning on each — two predicates each touching ~√N of N sorted
    * files instead of one touching 1 and the other touching all.
    * Compose: `zorderKey` → [[rangeShards]]/[[rangeShardsWithBounds]] →
    * write sorted-by-key (min/max file stats then prune both columns).
    *
    * Pure integer bit arithmetic — one codegen'd expression, map-side,
    * engine-portable (the oracle re-derives it bit for bit), and
    * streaming-safe. Caller contract: inputs non-negative and below
    * 2^bits (masked, not checked — a clipped key still z-orders, it
    * just aliases the overflow region). `bits` is capped at 31: at 32,
    * `b`'s bit 31 would land in the long's SIGN bit, so any b ≥ 2^31
    * produced a negative key sorting before all others — inverting the
    * z-curve (r13 advice). When composing with [[rangeShards]] keep
    * `2*bits ≤ 52`: the percentile boundary arithmetic casts the key to
    * double, and keys above 2^52 lose low-order bits there (the
    * locality cost is marginal — the lost bits are the finest
    * interleave — but boundary assignment would stop being exact).
    *
    * Composition note: the expression is 2·bits terms wide, and
    * project-collapse will happily inline it into every downstream
    * consumer (a [[rangeShards]] composition re-evaluates it in the
    * percentile input, the null filter, and once per boundary in the
    * assignment lambda — measured 4× the whole gate's cost at sf0.1).
    * When the key feeds more than one operator, alias it through
    * `GraftExpressions.opaque` to pin a single evaluation — but keep
    * the opaque alias OUT of join keys/aggregation keys (it is marked
    * nondeterministic; see Opaque's scaladoc).
    */
  def zorderKey(a: Column, b: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31,
      s"bits must be in [1, 31] (bit 31 of b would hit the long sign bit), got $bits")
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(a.cast("long"), i).bitwiseAND(lit(1L)), 2 * i))
        .bitwiseOR(shiftleft(shiftright(b.cast("long"), i).bitwiseAND(lit(1L)), 2 * i + 1))
    }
  }
}
