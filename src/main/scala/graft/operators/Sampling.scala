package graft.operators

import graft.dedup.SimHash64
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.graft.GraftSqlBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** `md5_hash64(string)` → first 8 bytes of MD5, big-endian, as a long —
 * the same auditable hash the SimHash family uses, exposed as a scalar so
 * sampling decisions can be re-derived by any engine with `md5()`.
 * Codegen'd (one static call, no row boxing): this expression gates every
 * row of the corpus in sampling/split/mixing, so it must not be the thing
 * that breaks the scan stage's whole-stage span. */
case class Md5Hash64(child: Expression)
  extends UnaryExpression with ExpectsInputTypes {

  override def nullIntolerant: Boolean = true
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    SimHash64.md5Hash64(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.dedup.SimHash64.md5Hash64($c);")

  override def prettyName: String = "md5_hash64"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/**
 * Deterministic sampling and dataset splits for training pipelines.
 *
 * Random sampling (`df.sample`) gives a DIFFERENT subset every run and
 * engine, which is poison for reproducible training sets. These helpers
 * decide membership from a hash of a stable key instead: the same row
 * lands in the same split on every run, on every engine, and membership
 * is auditable off-Spark (`md5()` + integer compare — see the q30
 * oracle). Purely map-side: no shuffle, no state, scales with the scan.
 *
 * Mechanics: the top 63 bits of md5_hash64(key) are uniform on
 * [0, 2^63); a fraction `num/den` keeps rows with
 * `hash >>> 1 < floor(num·2^63/den)`.
 */
object Sampling {

  def md5Hash64(c: Column): Column =
    GraftSqlBridge.column(Md5Hash64(GraftSqlBridge.expression(c)))

  private def threshold(num: Long, den: Long): Long =
    ((BigInt(num) << 63) / BigInt(den)).toLong

  /** Uniform deterministic sample: keeps ~num/den of rows, stable by key.
   * The full fraction (num == den) keeps every row — the hash comparison
   * cannot express it (2^63 overflows the signed threshold), so it
   * short-circuits to the unfiltered frame. */
  def deterministicSample(df: DataFrame, keyCol: Column, num: Long, den: Long): DataFrame = {
    require(num >= 0 && den > 0 && num <= den, s"bad fraction $num/$den")
    if (num == den) df
    else df.filter(sampleMembership(keyCol, num, den))
  }

  /** [[deterministicSample]]'s membership rule as a reusable PREDICATE
   * column — for counting or auditing a sample without filtering it
   * (num == den is always true, same short-circuit). */
  def sampleMembership(keyCol: Column, num: Long, den: Long): Column = {
    require(num >= 0 && den > 0 && num <= den, s"bad fraction $num/$den")
    if (num == den) lit(true)
    else shiftrightunsigned(md5Hash64(keyCol.cast("string")), 1) < lit(threshold(num, den))
  }

  /**
   * Deterministic corpus mixing — sample each key (source/domain) at its
   * own rate, the "mix domains at specified ratios" step of training-data
   * assembly. `weights` maps key → fraction (num, den); keys absent from
   * the spec are DROPPED (a mixture spec is a whitelist). Membership uses
   * the same md5-threshold rule as [[deterministicSample]], so the subset
   * is identical on every run and engine, and rows of one key keep their
   * membership when its rate goes up (nested samples — a 1/4 mix is a
   * subset of the same key's 2/4 mix). The per-key thresholds ride a
   * broadcast join: |weights| rows against the corpus, never a shuffle.
   */
  def weightedMix(df: DataFrame, keyCol: Column, idCol: Column,
      weights: Seq[(String, (Long, Long))]): DataFrame = {
    weights.foreach { case (k, (num, den)) =>
      require(num >= 0 && den > 0 && num <= den, s"bad fraction $num/$den for key $k")
    }
    // A duplicated key would JOIN-multiply its rows (every row matches each
    // spec entry) — silent duplication in a deterministic-sampling API.
    val dup = weights.groupBy(_._1).collect { case (k, vs) if vs.size > 1 => k }
    require(dup.isEmpty, s"duplicate keys in mixture spec: ${dup.mkString(", ")}")
    val spark = df.sparkSession
    import spark.implicits._
    val wdf = weights
      .map { case (k, (num, den)) => (k, threshold(num, den), num == den) }
      .toDF("__mix_key", "__mix_thr", "__mix_all")
    df.join(broadcast(wdf), keyCol === col("__mix_key"))
      .filter(col("__mix_all") ||
        shiftrightunsigned(md5Hash64(idCol.cast("string")), 1) < col("__mix_thr"))
      .drop("__mix_key", "__mix_thr", "__mix_all")
  }

  /**
   * Rate-change audit for [[weightedMix]]: one row per key actually present
   * in `df` — the spec rate (null for unlisted keys, which the mix drops
   * wholesale), the key's total row count, and how many rows the mix keeps.
   * This is the reconciliation an operator runs after EVERY spec change:
   * n_kept/n_total ≈ num/den per listed key, n_kept = 0 for dropped keys,
   * and because samples nest, a key whose rate went up keeps a superset of
   * its previous rows (only n_kept moves, membership never churns).
   *
   * Cost: two aggregations over the corpus (totals + kept) joined on the
   * key — group counts only, nothing per-row leaves the map side.
   */
  def mixAudit(df: DataFrame, keyCol: Column, idCol: Column,
      weights: Seq[(String, (Long, Long))]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val wdf = weights.map { case (k, (num, den)) => (k, num, den) }
      .toDF("key", "mix_num", "mix_den")
    val totals = df.groupBy(keyCol.as("key")).agg(count(lit(1)).as("n_total"))
    val kept = weightedMix(df, keyCol, idCol, weights)
      .groupBy(keyCol.as("key")).agg(count(lit(1)).as("n_kept"))
    totals
      .join(broadcast(wdf), Seq("key"), "left")
      .join(kept, Seq("key"), "left")
      .select(col("key"), col("mix_num"), col("mix_den"), col("n_total"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"))
  }

  /**
   * Deterministic epoch shuffle for training-data serving: every row gets
   * a shard and a reproducible position within it, so a 100 TB corpus
   * streams in a pseudo-random order that is byte-identical on every
   * rerun, resumable mid-epoch, and re-derivable by any engine (the
   * permutation key is the auditable md5-64 of `seed:id`). A new `seed`
   * is a fresh permutation — one integer bump per epoch, no data rewrite.
   *
   * Scale contract: NO global sort. Shard assignment is a map-side
   * projection; the within-shard position is a window over the shard
   * partition — each shard sorts independently (the same per-shard sort a
   * sorted-shard-file write pays anyway), so the plan is one exchange by
   * shard and parallel local sorts, never a single rangepartitioned
   * total order.
   *
   * @param nShards shard count. Power-of-two counts make the assignment
   *   portable to unsigned engines as-is (two's-complement low bits agree
   *   with `pmod` there); any positive count is valid within Spark.
   */
  def epochShards(df: DataFrame, idCol: Column, seed: Long,
      nShards: Int): DataFrame = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    val clash = df.columns.toSet.intersect(Set("shard", "pos", "__shuffle_h"))
    require(clash.isEmpty,
      s"epochShards writes columns ${clash.mkString(", ")} that already " +
        "exist on the input — rename them first (silent overwrite would " +
        "corrupt the caller's data)")
    val h = md5Hash64(concat_ws(":", lit(seed), idCol.cast("string")))
    df.withColumn("__shuffle_h", h)
      .withColumn("shard", pmod(col("__shuffle_h"), lit(nShards)).cast("int"))
      .withColumn("pos", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("shard"))
          .orderBy(col("__shuffle_h"), idCol)))
      .drop("__shuffle_h")
  }

  /**
   * Deterministic token-budget corpus selection: admit rows in the
   * pseudo-random order `md5_64(seed:id)` until the cumulative `weight`
   * (token count, byte count, …) reaches `budget` — "give me a uniform
   * ~B-token slice of this corpus" as one reproducible, engine-exact
   * operator. A row is kept iff the cumulative weight BEFORE it is under
   * the budget, so the slice always crosses the line by at most one row
   * and is never empty while the budget is positive. A new seed draws a
   * fresh slice; a larger budget EXTENDS the old slice (prefix property
   * — the hash order does not change), which is what makes grown training
   * mixes diff-able run over run.
   *
   * Scale contract: NO global sort and NO driver round-trip. The global
   * prefix sum is two-phase: rows bucket by the hash's top 7 bits (128
   * buckets, uniform for md5, and bucket order = signed hash order, so
   * concatenated buckets ARE the global order); a per-bucket running sum
   * is a window over each bucket partition, and the 128 bucket offsets
   * come from one tiny single-partition window over the 128-row bucket
   * totals, broadcast back. Everything that shuffles is (id, weight,
   * hash) — text never moves. Logical bucketing (not
   * spark_partition_id) keeps the result invariant to AQE coalescing and
   * physical partitioning.
   *
   * @return (id, weight, cum_before) for admitted rows — semi-join the
   *   corpus against `id` to materialize the slice.
   */
  /** Bucket fan-out of [[tokenBudgetSample]]'s two-phase prefix sum: the
   * hash's top [[BudgetBucketBits]] bits give 2^bits buckets whose order
   * equals the signed hash order. 128 keeps the offsets table trivially
   * broadcastable while spreading the heavy phase across the cluster. */
  private val BudgetBucketBits = 7

  def tokenBudgetSample(df: DataFrame, idCol: Column, weightCol: Column,
      budget: Long, seed: Long): DataFrame = {
    require(budget >= 0, s"budget must be non-negative, got $budget")
    val nBuckets = 1 << BudgetBucketBits
    val h = md5Hash64(concat_ws(":", lit(seed), idCol.cast("string")))
    val slim = df.select(idCol.as("id"), weightCol.cast("long").as("weight"),
      h.as("h"))
      .withColumn("b",
        (shiftright(col("h"), 64 - BudgetBucketBits) + lit(nBuckets / 2)).cast("int"))
    val inBucket = Window.partitionBy(col("b")).orderBy(col("h"), col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = slim.withColumn("cum_local", sum(col("weight")).over(inBucket))
    val acrossBuckets = Window.orderBy(col("b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = slim.groupBy(col("b")).agg(sum(col("weight")).as("tot"))
      .withColumn("off", coalesce(sum(col("tot")).over(acrossBuckets), lit(0L)))
      .select(col("b"), col("off"))
    local.join(broadcast(offsets), Seq("b"))
      .withColumn("cum_before", col("off") + col("cum_local") - col("weight"))
      .filter(col("cum_before") < budget)
      .select(col("id"), col("weight"), col("cum_before"))
  }

  /**
   * Per-key (stratified) token budgets — [[tokenBudgetSample]] run
   * independently inside every key of a budget spec: "2B tokens of web,
   * 500M of code, …", the per-domain half of training-mix assembly (the
   * rate-based half is [[weightedMix]]). Keys absent from the spec are
   * DROPPED (a budget spec is a whitelist, like a mixture spec); a key's
   * slice has the same admission order, at-most-one-row overshoot, and
   * grown-budget prefix property as the global operator, per key.
   *
   * Scale contract: identical to [[tokenBudgetSample]] with every stage
   * keyed by (key, bucket) instead of (bucket) — the offsets table grows
   * to |spec| × 128 rows, still a broadcast; nothing else changes.
   *
   * @return (key, id, weight, cum_before) for admitted rows.
   */
  def tokenBudgetSampleByKey(df: DataFrame, keyCol: Column, idCol: Column,
      weightCol: Column, budgets: Seq[(String, Long)], seed: Long): DataFrame = {
    require(budgets.nonEmpty, "budget spec must not be empty")
    budgets.foreach { case (k, b) =>
      require(b >= 0, s"budget must be non-negative, got $b for key $k")
    }
    val dup = budgets.groupBy(_._1).collect { case (k, vs) if vs.size > 1 => k }
    require(dup.isEmpty, s"duplicate keys in budget spec: ${dup.mkString(", ")}")
    val spark = df.sparkSession
    import spark.implicits._
    tokenBudgetSampleByKeyFrame(df, keyCol, idCol, weightCol,
      budgets.toDF("key", "__budget"), seed)
  }

  /**
   * [[tokenBudgetSampleByKey]] with the budget spec as a DATAFRAME of
   * `(key, __budget)` instead of a driver-side Seq — for specs DERIVED
   * from the data in the same plan ([[temperatureMix]]), where collecting
   * them first would insert a barrier between derivation and use. The
   * spec frame must be |keys|-bounded and duplicate-free (true by
   * construction for any aggregate over the key); it rides a broadcast,
   * exactly like the literal spec.
   */
  private def tokenBudgetSampleByKeyFrame(df: DataFrame, keyCol: Column,
      idCol: Column, weightCol: Column, bdf: DataFrame, seed: Long): DataFrame = {
    val nBuckets = 1 << BudgetBucketBits
    val h = md5Hash64(concat_ws(":", lit(seed), idCol.cast("string")))
    val slim = df
      .select(keyCol.as("key"), idCol.as("id"),
        weightCol.cast("long").as("weight"), h.as("h"))
      .join(broadcast(bdf), Seq("key"))
      .withColumn("b",
        (shiftright(col("h"), 64 - BudgetBucketBits) + lit(nBuckets / 2)).cast("int"))
    val inBucket = Window.partitionBy(col("key"), col("b"))
      .orderBy(col("h"), col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = slim.withColumn("cum_local", sum(col("weight")).over(inBucket))
    val acrossBuckets = Window.partitionBy(col("key")).orderBy(col("b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = slim.groupBy(col("key"), col("b"))
      .agg(sum(col("weight")).as("tot"))
      .withColumn("off", coalesce(sum(col("tot")).over(acrossBuckets), lit(0L)))
      .select(col("key"), col("b"), col("off"))
    local.join(broadcast(offsets), Seq("key", "b"))
      .withColumn("cum_before", col("off") + col("cum_local") - col("weight"))
      .filter(col("cum_before") < col("__budget"))
      .select(col("key"), col("id"), col("weight"), col("cum_before"))
  }

  /**
   * Deterministic train/validation/test split column. `fractions` are
   * (label, numerator) pairs over a common `den`; they must sum to `den`
   * so every row gets exactly one label. Rows label by which cumulative
   * threshold their key hash falls under.
   */
  def splitColumn(keyCol: Column, fractions: Seq[(String, Long)], den: Long): Column = {
    require(fractions.map(_._2).sum == den,
      s"fractions ${fractions.map(_._2)} must sum to den=$den")
    val h = shiftrightunsigned(md5Hash64(keyCol.cast("string")), 1)
    val cumulative = fractions.scanLeft(0L) { case (acc, (_, n)) => acc + n }.tail
    val cases = fractions.map(_._1).zip(cumulative)
    cases.init.foldRight(lit(cases.last._1)) { case ((label, cum), elseCol) =>
      when(h < lit(threshold(cum, den)), label).otherwise(elseCol)
    }
  }

  /**
   * EXACTLY-n-per-key deterministic sample: for every key, the `n` rows
   * with the smallest `md5(seed:id)` values — balanced subset construction
   * (n eval docs per source, n examples per class), where the fractional
   * samplers above cannot promise per-key counts. Deterministic and
   * engine-reproducible like everything in this file; a fresh `seed`
   * draws an independent balanced sample; keys with fewer than `n` rows
   * keep all of them.
   *
   * Scale shape: one map-side projection to (key, (u, id)) coordinates,
   * then the bounded [[TopK.topKStructs]] aggregate — each task forwards
   * AT MOST n structs per key into the exchange (a window formulation
   * would shuffle and sort every row of every key).
   *
   * @return (key, rank, id) with rank in [1, n] in hash order — rank is
   *         itself reproducible, so rank ≤ m is the same sample for any
   *         m ≤ n (nested, like the fractional samplers)
   */
  def samplePerKey(df: DataFrame, keyCol: Column, idCol: Column,
      n: Int, seed: Long): DataFrame = {
    require(n > 0, s"n must be positive, got $n")
    val u = shiftrightunsigned(
      md5Hash64(concat_ws(":", lit(seed), idCol.cast("string"))), 1)
    df.select(keyCol.as("key"),
        struct(u.as("u"), idCol.as("id")).as("sn"))
      .groupBy("key")
      .agg(sort_array(TopK.topKStructs(col("sn"), n)).as("tk"))
      .select(col("key"), posexplode(col("tk")).as(Seq("pos", "t")))
      .select(col("key"), (col("pos") + 1).as("rank"), col("t.id").as("id"))
  }

  /**
   * WEIGHTED sampling without replacement, deterministic: each row gets
   * `weightCol` integer tickets (0 tickets → never sampled), every ticket
   * draws a uniform `md5(seed:id:i)` value, and the row's priority is its
   * SMALLEST ticket; the global sample is the `n` rows with the smallest
   * priorities (ties by id). More tickets → stochastically smaller
   * minimum → higher selection odds, monotonically in the weight — the
   * integer-exact stand-in for Efraimidis–Spirakis exponential-key
   * sampling, whose `u^(1/w)` keys cannot be reproduced bit-for-bit
   * across engines (float pow), while this scheme is pure md5 + min and
   * re-derivable anywhere (the oracle unrolls tickets with
   * `generate_series`).
   *
   * Scale shape: the priority is computed MAP-SIDE inside one projection
   * (a `transform`/`array_min` over a `sequence` of ticket indexes — no
   * row explosion, no shuffle of tickets), and only (id, priority)
   * coordinates enter the global top-n, which Spark executes as
   * TakeOrderedAndProject: each task forwards at most `n` rows, the
   * driver merges |tasks|·n — no global sort at any scale. `maxTickets`
   * caps the per-row loop so a pathological weight can't stall a task;
   * rows above the cap are clamped (and the clamp is part of the
   * definition, so the oracle clamps identically).
   *
   * @return (id, weight, priority) for the n winners, priority ascending
   */
  def weightedSample(df: DataFrame, idCol: Column, weightCol: Column,
      n: Int, seed: Long, maxTickets: Int = 64): DataFrame = {
    require(n > 0, s"n must be positive, got $n")
    require(maxTickets > 0, s"maxTickets must be positive, got $maxTickets")
    val w = least(weightCol.cast("long"), lit(maxTickets.toLong))
    // sequence(0, w-1) would COUNT DOWN for w=0 (step -1), so zero-weight
    // rows are filtered before the ticket loop, not inside it.
    val ticket = (i: Column) => shiftrightunsigned(
      md5Hash64(concat_ws(":", lit(seed), idCol.cast("string"), i.cast("string"))), 1)
    df.filter(w > 0)
      .select(idCol.as("id"), w.as("weight"),
        array_min(transform(sequence(lit(0L), w - 1L), ticket)).as("priority"))
      .orderBy(col("priority"), col("id"))
      .limit(n)
  }

  /** floor(sqrt(2^63 − 1)) — the largest exact 64-bit integer square root. */
  private val IsqrtMax = 3037000499L

  /**
   * EXACT integer square root of a non-negative BIGINT column. Double
   * `sqrt` is within one of the truth everywhere (the argument loses at
   * most 2^-52 relatively going to double, and sqrt halves relative
   * error), so a ±1 correction over exact long squares makes it exact for
   * the full int64 range; the cap keeps the `(s+1)²` probe from wrapping
   * near 2^63. The same three-branch CASE re-derives it in DuckDB, so
   * temperature weights are engine-identical — the reason this exists
   * instead of a float `pow(n, alpha)`.
   */
  def isqrt(n: Column): Column = {
    val s0 = least(floor(sqrt(n.cast("double"))).cast("long"), lit(IsqrtMax))
    when(s0 < IsqrtMax && (s0 + 1) * (s0 + 1) <= n, s0 + 1)
      .when(s0 * s0 > n, s0 - 1)
      .otherwise(s0)
  }

  /**
   * Temperature-balanced budget allocation across keys — the multilingual
   * / multi-source sampling standard (sample source k proportionally to
   * n_k^alpha with alpha < 1, so small sources are up-weighted relative
   * to their share): per-key totals n_k, weights w_k = isqrt(n_k)
   * (alpha = 1/2, the common T = 2 operating point, chosen because it is
   * the one temperature with an EXACT integer weight — float pow would
   * make every downstream budget engine-dependent), and a
   * largest-remainder split of `totalBudget` over the weights:
   * t_k = q·w_k + floor(rem·w_k / W) with the leftover units going to the
   * largest remainders (ties to the smaller key). Sum of budgets ==
   * totalBudget exactly whenever any key has weight.
   *
   * Scale contract: one partial-aggregating pass over the corpus builds
   * the |keys|-row totals; everything after is |keys|-bounded (the
   * q/rem/leftover arithmetic and the remainder ranking are
   * single-partition window passes over the |keys|-row aggregate — the
   * same bounded-model contract as the vocab queries). FULLY LAZY: the
   * whole allocation is one declarative plan with NO driver collect, so a
   * caller composing it (temperatureMix's broadcast join, a sink) pays a
   * single action — the former driver formulation cost a mandatory
   * collect barrier before any downstream work could even plan. Overflow
   * guard: rem·max(w) must fit a long — |keys|·max(w)² < 2^63, amply true
   * for source/domain/language keys (checked in-plan, same message).
   *
   * @return (key, n, w, budget) — one row per key present in `df`.
   */
  def temperatureBudgets(df: DataFrame, keyCol: Column, weightCol: Column,
      totalBudget: Long): DataFrame = {
    require(totalBudget >= 0, s"totalBudget must be non-negative, got $totalBudget")
    val totals = df.groupBy(keyCol.as("key"))
      .agg(coalesce(sum(weightCol.cast("long")), lit(0L)).as("n"))
      // coalesce, not an exchange: the global windows below need one
      // partition, and folding the aggregate's reducers beats shuffling
      // |keys| rows again (one fewer stage barrier under AQE). The merged
      // final aggregation stays |keys|-bounded per the operator contract.
      .coalesce(1)
    // Everything below is |keys|-row single-partition work. The empty
    // partitionBy is deliberate (and the plan's one "no partition defined"
    // warning is the documented cost): the largest-remainder rule is a
    // GLOBAL ranking by definition.
    val everything = Window.partitionBy()
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    // Tie-break ties-to-the-smaller-key in the engine's own type ordering
    // (binary UTF8 for strings), nulls first — `asc` is NULLS FIRST in
    // Spark, matching the former driver-side nullsFirst wrapper.
    val remainderRank = Window.partitionBy()
      .orderBy(col("__rpart").desc, col("key").asc)
    val tb = s"CAST($totalBudget AS BIGINT)"
    totals
      .withColumn("w", isqrt(greatest(col("n"), lit(0L))))
      .withColumn("__W", sum(col("w")).over(everything))
      .withColumn("__maxw", max(col("w")).over(everything))
      // All integer arithmetic, W = 0 guarded in every branch (ANSI mode
      // would otherwise fail the division before the CASE could skip it —
      // CaseWhen evaluates lazily, so the guard is sufficient).
      .withColumn("__rem", expr(s"CASE WHEN __W > 0 THEN $tb % __W ELSE 0L END"))
      // The former driver `require`: rem·max(w) must not overflow. CASE
      // branches evaluate lazily, so assert_true only fires on violation.
      .withColumn("__ovf", expr(
        "CASE WHEN __rem > 0 AND __maxw > 9223372036854775807 div __rem THEN " +
          "CAST(assert_true(false, 'rem*w overflows long (rem=' || __rem || " +
          "', max w=' || __maxw || ') — totalBudget/key-count out of range') " +
          "AS BIGINT) ELSE 0L END"))
      .withColumn("__base", expr(
        s"CASE WHEN __W > 0 THEN ($tb div __W) * w + (__rem * w) div __W + __ovf " +
          "ELSE 0L END"))
      .withColumn("__rpart",
        expr("CASE WHEN __W > 0 THEN (__rem * w) % __W ELSE 0L END"))
      .withColumn("__allocated", sum(col("__base")).over(everything))
      .withColumn("__rk", row_number().over(remainderRank))
      // leftover = totalBudget − Σbase < |keys| by construction; the
      // first `leftover` keys in (rpart desc, key asc) order get +1.
      .withColumn("budget", expr(
        s"CASE WHEN __W > 0 THEN __base + " +
          s"(CASE WHEN CAST(__rk AS BIGINT) <= $tb - __allocated THEN 1L ELSE 0L END) " +
          "ELSE 0L END"))
      .select(col("key"), col("n"), col("w"), col("budget"))
  }

  /**
   * Temperature-balanced corpus selection: [[temperatureBudgets]] to
   * derive per-key token budgets from the data itself, then the
   * deterministic admit-in-md5-order rule of [[tokenBudgetSampleByKey]]
   * under those budgets. The spec collect is |keys|-bounded (same
   * contract as the allocation itself). Grown budgets extend the
   * per-key slices (prefix property inherited from the budget sampler).
   *
   * @return (key, id, weight, cum_before) for admitted rows.
   */
  def temperatureMix(df: DataFrame, keyCol: Column, idCol: Column,
      weightCol: Column, totalBudget: Long, seed: Long): DataFrame = {
    // ONE action, ONE corpus pass, ZERO driver collects: the former
    // formulation collected the spec (a mandatory barrier between
    // derivation and admission) and persisted a corpus-wide slim
    // projection that nothing ever unpersisted. Here a PLANTED (key,
    // bucket) exchange is the single materialization point — the weight
    // column (typically a tokenizer over full text) is evaluated exactly
    // once, on the map side of that shuffle — and all three consumers
    // (per-key totals for the spec, the in-bucket running sums, the
    // cross-bucket offsets) read the SAME exchange via reuse: their
    // subtrees are identical below it, so the scheduler materializes it
    // once. Everything above the exchange is |keys|- or |keys·buckets|-
    // bounded except the in-bucket window, which is the admit rule's own
    // distributed phase.
    val nBuckets = 1 << BudgetBucketBits
    val h = md5Hash64(concat_ws(":", lit(seed), idCol.cast("string")))
    val slimX = df
      .select(keyCol.as("key"), idCol.as("id"),
        weightCol.cast("long").as("weight"), h.as("h"))
      .withColumn("b",
        (shiftright(col("h"), 64 - BudgetBucketBits) + lit(nBuckets / 2)).cast("int"))
      .repartition(col("key"), col("b"))
    // Fail FAST on a null group: [[temperatureBudgets]] allows it
    // (nullable key schema), but the admit rule joins budgets per key
    // with an equi-join, which null never matches — the null group's
    // budget would be silently allocated and then unspendable. Callers
    // with null keys must filter or coalesce them first. In-plan, and
    // deliberately inside a WINDOW aggregate: the inner join plants an
    // `isnotnull(key)` filter that would prune the null row before a
    // plain projection-level assert could see it, but a predicate cannot
    // push below an unpartitioned Window, so this guard observes EVERY
    // spec row (the asserting branch only evaluates for a null key —
    // CaseWhen is lazy).
    val everything = Window.partitionBy()
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val nullGuard = max(when(col("key").isNull,
      coalesce(
        assert_true(lit(false),
          lit("temperatureMix requires non-null keys: a null key group " +
            "cannot match the per-key budget equi-join — filter null keys " +
            "or coalesce the key column to a sentinel before mixing"))
          .cast("long"),
        lit(0L))).otherwise(lit(0L))).over(everything)
    val spec = temperatureBudgets(slimX, col("key"), col("weight"), totalBudget)
      .select(col("key"), (col("budget") + nullGuard).as("__budget"))
    // The admit rule of [[tokenBudgetSampleByKey]], re-rooted on the shared
    // exchange. Same math, same hash, same output — offsets here derive
    // from the exchanged rows (a no-shuffle complete aggregation: the
    // planted partitioning already clusters (key, b)) instead of a second
    // scan of the input.
    val inBucket = Window.partitionBy(col("key"), col("b"))
      .orderBy(col("h"), col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = slimX.withColumn("cum_local", sum(col("weight")).over(inBucket))
    val acrossBuckets = Window.partitionBy(col("key")).orderBy(col("b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = slimX.groupBy(col("key"), col("b"))
      .agg(sum(col("weight")).as("tot"))
      .withColumn("off", coalesce(sum(col("tot")).over(acrossBuckets), lit(0L)))
      .select(col("key"), col("b"), col("off"))
    local.join(broadcast(offsets), Seq("key", "b"))
      .join(broadcast(spec), Seq("key"))
      .withColumn("cum_before", col("off") + col("cum_local") - col("weight"))
      .filter(col("cum_before") < col("__budget"))
      .select(col("key"), col("id"), col("weight"), col("cum_before"))
  }
}
