package graft.frontier

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import graft.model.Candidate

/** Partitioned bloom-filter + exact-table URL-seen set (J5 in SURVEY.md §2.3).
  *
  * Scale design for a 10^10-URL frontier:
  *  - `bucket = pmod(murmur3_128(url), numBuckets)`; the exact seen table is
  *    stored partitioned by bucket, one BloomFilter per bucket.
  *  - Candidates COGROUP with blooms on bucket: each bucket's filter bytes
  *    move to exactly one task per epoch (never broadcast, never all on the
  *    driver or one executor). Bloom misses are DEFINITELY new (no false
  *    negatives) and skip the exact check entirely.
  *  - Only bloom maybe-hits (true dupes + fpp of new) anti-join the seen
  *    table, and that read is partition-pruned to the buckets that actually
  *    contain maybe-hits.
  *  - Blooms are incremental: newly-seen URLs merge into the per-bucket
  *    filters each epoch; they are never rebuilt from the full table.
  *
  * Sizing at the north-rule target: 10^10 urls / 4096 buckets ≈ 2.44M per
  * bucket ≈ 2.9 MiB of filter at 1% fpp ≈ 12 GiB total, spread bucket-per-
  * task. Sandbox scales use small bucket counts (same code path).
  */
object SeenSet {

  final case class Config(numBuckets: Int = 64,
                          expectedPerBucket: Long = 1L << 20,
                          bloomFpp: Double = 0.01,
                          maxBloomSegments: Int = 12)

  /** (bucket, bloomBytes) rows — the persisted form. */
  final case class BucketBloom(bucket: Int, bytes: Array[Byte])

  /** JVM-side bucket function; MUST stay consistent for the lifetime of a
    * crawl state (it keys both blooms and the seen-table layout). */
  def bucketOfUrl(url: String, numBuckets: Int): Int = {
    val h = com.google.common.hash.Hashing.murmur3_128()
      .hashString(url, java.nio.charset.StandardCharsets.UTF_8).asLong()
    (((h % numBuckets) + numBuckets) % numBuckets).toInt
  }

  def serialize(bf: BloomFilter): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }

  def deserialize(b: Array[Byte]): BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(b))

  /** Build per-bucket blooms from a set of urls. */
  def buildBlooms(spark: SparkSession, urls: Dataset[String], cfg: Config): Dataset[BucketBloom] = {
    import spark.implicits._
    urls.groupByKey(u => bucketOfUrl(u, cfg.numBuckets))
      .mapGroups { (bucket, it) =>
        val bf = BloomFilter.create(cfg.expectedPerBucket, cfg.bloomFpp)
        it.foreach(bf.putString)
        BucketBloom(bucket, serialize(bf))
      }
  }

  /** Per-bucket blooms for ONE epoch's newly-seen delta, each filter sized
    * to its ACTUAL insert count. BloomFilter allocates bits for the
    * expected capacity up front, so sizing deltas at `expectedPerBucket`
    * would make every epoch's delta write as large as a full rewrite
    * (round 1 rewrote the whole ~12 GiB bucket table per epoch at the
    * target sizing). Delta segments append via the snapshot's `;`-segment
    * list; the read side unions them (a url is maybe-seen if ANY segment
    * filter contains it — no false negatives ever). Each extra segment
    * adds its own fpp to the union check, which is why [[Config
    * .maxBloomSegments]] bounds the list via major compaction (rebuild
    * full-capacity filters from the bucket-partitioned seen table,
    * amortized to 1/maxBloomSegments of a full pass per epoch). */
  def buildDeltaBlooms(spark: SparkSession, urls: Dataset[String], cfg: Config): Dataset[BucketBloom] = {
    import spark.implicits._
    urls.groupByKey(u => bucketOfUrl(u, cfg.numBuckets))
      .mapGroups { (bucket, it) =>
        val buf = it.toArray
        val bf = BloomFilter.create(math.max(buf.length.toLong, 64L), cfg.bloomFpp)
        buf.foreach(bf.putString)
        BucketBloom(bucket, serialize(bf))
      }
  }

  /** Merge newly seen urls into existing blooms (missing buckets created).
    * Requires equal-capacity filters (same cfg) — used for full-table
    * merges; the epoch path appends [[buildDeltaBlooms]] segments instead. */
  def mergeBlooms(spark: SparkSession, old: Dataset[BucketBloom],
                  newUrls: Dataset[String], cfg: Config): Dataset[BucketBloom] = {
    import spark.implicits._
    val fresh = buildBlooms(spark, newUrls, cfg)
    old.groupByKey(_.bucket).cogroup(fresh.groupByKey(_.bucket)) { (bucket, os, ns) =>
      val o = os.toSeq.headOption
      val n = ns.toSeq.headOption
      (o, n) match {
        case (Some(a), Some(b)) =>
          val bf = deserialize(a.bytes); bf.mergeInPlace(deserialize(b.bytes))
          Iterator(BucketBloom(bucket, serialize(bf)))
        case (Some(a), None) => Iterator(a)
        case (None, Some(b)) => Iterator(b)
        case (None, None)    => Iterator.empty
      }
    }
  }

  /** Split candidates by bloom verdict: (definitelyNew, maybeSeen).
    * One shuffle by bucket; each bucket's filter meets its candidates in a
    * single task (no broadcast). */
  def bloomSplit(spark: SparkSession, candidates: Dataset[Candidate],
                 blooms: Dataset[BucketBloom], cfg: Config)
      : (Dataset[Candidate], Dataset[Candidate]) = {
    import spark.implicits._
    val marked: Dataset[(Candidate, Boolean)] =
      candidates.groupByKey(c => bucketOfUrl(c.url, cfg.numBuckets))
        .cogroup(blooms.groupByKey(_.bucket)) { (bucket, cs, bs) =>
          // a bucket may carry several delta-segment filters (LSM shape);
          // maybe-seen = contained in ANY segment (no false negatives)
          val fs = bs.filter(_.bytes.nonEmpty).map(b => deserialize(b.bytes)).toArray
          if (fs.isEmpty) cs.map(c => (c, false)) // empty bucket: all new
          else cs.map(c => (c, fs.exists(_.mightContainString(c.url))))
        }
    val cached = marked.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    (cached.filter(!_._2).map(_._1), cached.filter(_._2).map(_._1))
  }

  /** Deterministic per-url reducer shared with the oracle: priority DESC,
    * retries DESC, discoveredEpoch ASC (total tie-breaks: replay-exact). */
  def reduceCandidates(a: Candidate, b: Candidate): Candidate =
    if (a.priority != b.priority) { if (a.priority > b.priority) a else b }
    else if (a.retries != b.retries) { if (a.retries > b.retries) a else b }
    else if (a.discoveredEpoch <= b.discoveredEpoch) a else b

  /** FUSED in-batch URL dedup + bloom prefilter + partition-pruned exact
    * anti-join: since the url-dedup key and the bloom bucket are both
    * functions of url, one shuffle by bucket serves both (a separate
    * groupByKey(url) pass would shuffle the same rows twice). Retried
    * candidates bypass the seen check (scheduled once already, fetch
    * missed). Returns the deduplicated not-seen candidates. */
  def dedupAndFilterNew(spark: SparkSession, candidates: Dataset[Candidate],
                        seen: DataFrame, blooms: Dataset[BucketBloom],
                        cfg: Config): Dataset[Candidate] = {
    import spark.implicits._
    val marked: Dataset[(Candidate, Boolean)] =
      candidates.groupByKey(c => bucketOfUrl(c.url, cfg.numBuckets))
        .cogroup(blooms.groupByKey(_.bucket)) { (bucket, cs, bs) =>
          val best = new java.util.HashMap[String, Candidate]()
          cs.foreach { c =>
            val prev = best.get(c.url)
            best.put(c.url, if (prev == null) c else reduceCandidates(prev, c))
          }
          // delta segments: maybe-seen = contained in ANY segment filter
          val fs = bs.filter(_.bytes.nonEmpty).map(b => deserialize(b.bytes)).toArray
          val it = best.values().iterator()
          new Iterator[(Candidate, Boolean)] {
            def hasNext = it.hasNext
            def next() = {
              val c = it.next()
              var maybe = false
              if (c.retries == 0) {
                var i = 0
                while (!maybe && i < fs.length) {
                  maybe = fs(i).mightContainString(c.url); i += 1
                }
              }
              (c, maybe)
            }
          }
        }
    val cached = marked.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val definitelyNew = cached.filter(!_._2).map(_._1)
    val maybe = cached.filter(_._2).map(_._1)
    // partition-pruning the seen read needs a driver round-trip (collect of
    // the hot bucket ids) that forces the cogroup early — worth one extra
    // job only when there are enough buckets for the prune to skip real
    // I/O (the 10^10 sizing uses 4096; tests/bench use 8-32 where every
    // bucket is hot anyway)
    val prunedSeen = if (cfg.numBuckets > 64) {
      val hotBuckets = maybe.map(c => bucketOfUrl(c.url, cfg.numBuckets)).distinct().collect()
      if (hotBuckets.length < cfg.numBuckets)
        seen.filter(col("bucket").isin(hotBuckets.map(Integer.valueOf).toIndexedSeq: _*))
      else seen
    } else seen
    val survived = maybe.join(prunedSeen.select(col("url")), Seq("url"), "left_anti").as[Candidate]
    definitelyNew.unionByName(survived)
  }

  /** candidates EXCEPT seen: bloom prefilter + partition-pruned anti-join.
    * `seen` must carry (url, bucket) columns, stored partitioned by bucket. */
  def filterNew(spark: SparkSession, candidates: Dataset[Candidate],
                seen: DataFrame, blooms: Dataset[BucketBloom], cfg: Config): Dataset[Candidate] = {
    import spark.implicits._
    val (definitelyNew, maybe) = bloomSplit(spark, candidates, blooms, cfg)
    // partition-prune the seen read to buckets that contain maybe-hits
    val hotBuckets = maybe.map(c => bucketOfUrl(c.url, cfg.numBuckets)).distinct().collect()
    val prunedSeen =
      if (hotBuckets.length < cfg.numBuckets)
        seen.filter(col("bucket").isin(hotBuckets.map(Integer.valueOf).toIndexedSeq: _*))
      else seen
    val survived = maybe.join(prunedSeen.select(col("url")), Seq("url"), "left_anti").as[Candidate]
    definitelyNew.unionByName(survived)
  }
}
