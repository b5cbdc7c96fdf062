package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines, each designed as a
  * shuffle-lean Spark plan:
  *
  *  - exact: one hash-shuffle on the content hash (map-side partial agg)
  *  - minhash LSH: shingle -> minhash signature -> banded bucket join; the
  *    O(n²) pair space collapses to within-bucket pairs
  *  - simhash: 64-bit signature, near-dups via banded equality (hamming<=k
  *    implies some band equal — pigeonhole), then exact hamming verify
  *  - n-gram jaccard: exact verification on LSH candidates only
  *  - embedding cosine: random-hyperplane LSH buckets, within-bucket verify
  *
  * All signatures are computed with seeded splitmix64 mixes of xxhash64 —
  * deterministic across runs and cluster sizes, no java Random.
  */
object Dedup {

  /** Exact dedup: keep the row with min(idCol) per identical `key`.
    * One shuffle; partial aggregation happens map-side. */
  def exactKeepMin(df: DataFrame, key: Column, idCol: String): DataFrame = {
    val keyed = df.withColumn("__k", xxhash64(key))
    val keepers = keyed.groupBy(col("__k")).agg(min(col(idCol)).as(idCol))
    keyed.join(keepers, Seq("__k", idCol), "left_semi").drop("__k")
  }

  /** Exact-dup group stats: (group key hash, group size, keeper id). */
  def exactGroups(df: DataFrame, key: Column, idCol: String): DataFrame =
    df.groupBy(xxhash64(key).as("content_hash"))
      .agg(count(lit(1)).as("n"), min(col(idCol)).as("keeper"))

  /** Word shingles of size k as an array column. */
  def shingles(text: Column, k: Int): Column = {
    val toks = regexp_extract_all(lower(text), lit("\\S+"), lit(0))
    when(size(toks) >= k,
      transform(sequence(lit(0), size(toks) - k),
        i => concat_ws(" ", slice(toks, i + 1, lit(k)))))
      .otherwise(array(concat_ws(" ", toks)))
  }

  private def bridge(c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    org.apache.spark.sql.GraftColumnBridge.expression(c)
  private def bridge(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    org.apache.spark.sql.GraftColumnBridge.column(e)

  /** Distinct k-shingle hashes as a column (one-pass custom expression). */
  def shingleHashes(text: Column, k: Int): Column =
    bridge(graft.sql.ShingleHashesExpr(bridge(text), k))

  /** MinHash signatures as (id, sig array<long>): ONE expression pass per
    * document — no shingle rows materialize or shuffle, no per-seed
    * aggregate columns. Hash-exact vs [[minhashSignaturesAgg]]
    * (differential-tested), so LSH buckets are unchanged. */
  def minhashSignatures(df: DataFrame, idCol: String, textCol: String,
                        shingleK: Int, numHashes: Int): DataFrame =
    df.select(col(idCol).as("id"),
      bridge(graft.sql.MinhashSigsExpr(bridge(col(textCol)), shingleK, numHashes)).as("sig"))

  /** The explode + hash-aggregate formulation (map-side combine, one
    * shuffle keyed by id). Kept as the differential reference for
    * [[minhashSignatures]]; same results, ~5x the cost. */
  private[pipeline] def minhashSignaturesAgg(df: DataFrame, idCol: String, textCol: String,
                                             shingleK: Int, numHashes: Int): DataFrame = {
    val exploded = df.select(col(idCol).as("id"),
        explode(array_distinct(shingles(col(textCol), shingleK))).as("s"))
      .select(col("id"), xxhash64(col("s")).as("h"))
    val seeds = (0 until numHashes).map(i => 0x9E3779B97F4A7C15L * (i + 1))
    val aggs = seeds.zipWithIndex.map { case (s, i) =>
      min(xxhash64(col("h").bitwiseXOR(lit(s)))).as(s"m$i")
    }
    exploded.groupBy(col("id")).agg(aggs.head, aggs.tail: _*)
      .select(col("id"), array((0 until numHashes).map(i => col(s"m$i")): _*).as("sig"))
  }

  /** Candidate near-dup pairs via banded MinHash LSH.
    * numHashes = bands * rowsPerBand. Output: (id_a, id_b) with id_a<id_b,
    * distinct. Only within-bucket pairs are generated (band value join). */
  def minhashLshPairs(df: DataFrame, idCol: String, textCol: String,
                      shingleK: Int = 5, bands: Int = 8, rowsPerBand: Int = 4): DataFrame = {
    val numHashes = bands * rowsPerBand
    val sigs = minhashSignatures(df, idCol, textCol, shingleK, numHashes)
    val bandCols = (0 until bands).map { b =>
      xxhash64(concat_ws(",",
        transform(slice(col("sig"), b * rowsPerBand + 1, rowsPerBand), _.cast("string"))))
    }
    val banded = sigs.select(col("id"), posexplode(array(bandCols: _*)))
      .toDF("id", "band", "bucket")
    val a = banded.toDF("id_a", "band", "bucket")
    val b = banded.toDF("id_b", "band", "bucket")
    a.join(b, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
  }

  /** Exact n-gram Jaccard similarity for given pairs (verification stage).
    * pairs: (id_a, id_b); returns pairs + jaccard. Shingle sets travel as
    * 8-byte hash arrays, not strings — intersection/union sizes are equal
    * modulo 64-bit collisions, and the join payload shrinks ~4x. */
  def ngramJaccard(df: DataFrame, pairs: DataFrame, idCol: String,
                   textCol: String, n: Int = 5): DataFrame = {
    val sh = df.select(col(idCol).as("id"), shingleHashes(col(textCol), n).as("sh"))
    pairs
      .join(sh.toDF("id_a", "sh_a"), Seq("id_a"))
      .join(sh.toDF("id_b", "sh_b"), Seq("id_b"))
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("uni", size(array_union(col("sh_a"), col("sh_b"))))
      .withColumn("jaccard",
        when(col("uni") > 0, col("inter").cast("double") / col("uni").cast("double")).otherwise(0.0))
      .select("id_a", "id_b", "jaccard")
  }

  /** Full MinHash near-dup pipeline: LSH candidates -> exact jaccard >= τ. */
  def minhashNearDups(df: DataFrame, idCol: String, textCol: String,
                      threshold: Double = 0.8, shingleK: Int = 5,
                      bands: Int = 8, rowsPerBand: Int = 4): DataFrame = {
    val pairs = minhashLshPairs(df, idCol, textCol, shingleK, bands, rowsPerBand)
    ngramJaccard(df, pairs, idCol, textCol, shingleK).filter(col("jaccard") >= threshold)
  }

  /** 64-bit SimHash signatures as (id, sig): ONE expression pass per
    * document (term-frequency-weighted bit votes over token hashes).
    * Hash-exact vs [[simhashSignaturesAgg]] for non-empty documents; an
    * all-whitespace document gets sig 0 here (the aggregate formulation
    * dropped it — no token rows to group). */
  def simhashSignatures(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("id"),
      bridge(graft.sql.SimhashSigExpr(bridge(col(textCol)))).as("sig"))

  /** Explode + 64-vote aggregate formulation, kept as the differential
    * reference for [[simhashSignatures]]. */
  private[pipeline] def simhashSignaturesAgg(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val exploded = df.select(col(idCol).as("id"),
        explode(regexp_extract_all(lower(col(textCol)), lit("\\S+"), lit(0))).as("t"))
      .select(col("id"), xxhash64(col("t")).as("h"))
    val aggs = (0 until 64).map { b =>
      sum(when(col("h").bitwiseAND(lit(1L << b)) =!= 0L, 1L).otherwise(-1L)).as(s"v$b")
    }
    val votes = exploded.groupBy(col("id")).agg(aggs.head, aggs.tail: _*)
    val sig = (0 until 64).map { b =>
      when(col(s"v$b") > 0, lit(1L << b)).otherwise(0L)
    }.reduce((a, c) => a.bitwiseOR(c))
    votes.select(col("id"), sig.as("sig"))
  }

  /** SimHash near-dup pairs with hamming distance <= maxHamming, found by
    * banding the 64-bit signature into (maxHamming+1) chunks (pigeonhole:
    * any pair within distance k agrees on at least one of k+1 bands). */
  def simhashNearDups(df: DataFrame, idCol: String, textCol: String,
                      maxHamming: Int = 3): DataFrame = {
    val nBands = maxHamming + 1
    val bandBits = 64 / nBands
    val sigs = simhashSignatures(df, idCol, textCol)
    val bandCols = (0 until nBands).map { b =>
      shiftrightunsigned(col("sig"), b * bandBits).bitwiseAND(lit((1L << bandBits) - 1))
    }
    val banded = sigs.select(col("id"), col("sig"), posexplode(array(bandCols: _*)))
      .toDF("id", "sig", "band", "bucket")
    val a = banded.toDF("id_a", "sig_a", "band", "bucket")
    val b = banded.toDF("id_b", "sig_b", "band", "bucket")
    a.join(b, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sig_a").bitwiseXOR(col("sig_b"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Embedding cosine near-dup via MULTI-BAND random-hyperplane LSH:
    * `bands` independent signatures of `planesPerBand` sign bits each; a
    * pair is a candidate if it collides in ANY band (posexplode + band
    * bucket join, the same shape as MinHash banding). A single wide
    * signature requires ALL bits to agree — P(all planes)^1 — so recall
    * collapses near the threshold; banding lifts it to
    * 1-(1-p^planesPerBand)^bands while each band join stays a cheap
    * equality shuffle. Candidates are exact-cosine verified. */
  def embeddingNearDups(df: DataFrame, idCol: String, vecCol: String,
                        threshold: Double = 0.95, bands: Int = 8,
                        planesPerBand: Int = 4,
                        dim: Int = 64, seed: Long = 42L): DataFrame = {
    val bandCols = (0 until bands).map { b =>
      // distinct planes per band: seed offset by band index
      Similarity.hyperplaneSignature(col(vecCol), planesPerBand, dim,
        seed + 0x51ED2701L * (b + 1))
    }
    // band join + pair-dedup on (id_a, id_b) ONLY — the distinct's shuffle
    // key is two longs, never the embedding arrays; vectors re-attach to
    // the (small) surviving candidate set by two hash joins
    val banded = df.select(col(idCol).as("id"),
      posexplode(array(bandCols: _*))).toDF("id", "band", "bucket")
    val pairs = banded.toDF("id_a", "band", "bucket")
      .join(banded.toDF("id_b", "band", "bucket"), Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    val v = df.select(col(idCol).as("id"), col(vecCol).as("v"))
    pairs
      .join(v.toDF("id_a", "v_a"), Seq("id_a"))
      .join(v.toDF("id_b", "v_b"), Seq("id_b"))
      .withColumn("cosine", Similarity.cosine(col("v_a"), col("v_b")))
      .filter(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")
  }
}
