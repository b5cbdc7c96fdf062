package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.pipeline.{Dedup, Similarity, TextStats, Multimodal}
import graft.sql.GraftFunctions
import graft.data.SyntheticCorpus

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Every operator from SURVEY.md §2 plus the training-data pipeline ops is
  * exposed as a `queries` entry; SQL-expressible ones carry a DuckDB oracle
  * in `oracleSql` (same parquet tables, same column names/aliases). */
object SparkEntry {

  private def t(sfDir: String, name: String) = s"$sfDir/$name.parquet"

  /** Flagship: full crawl-extraction over the Wikipedia parity row + a
    * synthetic page — exercises plist decode, HTML rewrite, outlinks. */
  def entry(spark: SparkSession): DataFrame = {
    GraftFunctions.register(spark)
    val wiki = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
      "/root/reference/webarchive/sample_data/Wikipedia.webarchive"))
    val synth = SyntheticCorpus.htmlOf(42L, 7L, 1000L).getBytes("UTF-8")
    val df = spark.createDataFrame(Seq(
      ("https://en.wikipedia.org/wiki/Main_Page", wiki),
      (SyntheticCorpus.urlOf(42L, 7L), synth))).toDF("url", "html")
    df.select(
      col("url"),
      length(GraftFunctions.extract_html(col("html"), col("url"))).as("extracted_len"),
      GraftFunctions.resource_count(col("html")).as("resources"),
      size(GraftFunctions.extract_outlinks(col("html"), col("url"))).as("outlinks"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- relational core (oracle-backed) ------------------------------------
    "q1_agg" -> ((s, d) => {
      s.read.parquet(t(d, "lineitem"))
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }),
    "q3_join" -> ((s, d) => {
      val c = s.read.parquet(t(d, "customer")).filter(col("c_mktsegment") === "BUILDING")
      val o = s.read.parquet(t(d, "orders"))
      val l = s.read.parquet(t(d, "lineitem"))
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .groupBy(col("l_orderkey"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey").asc)
        .limit(10)
    }),
    "q5_broadcast" -> ((s, d) => {
      val cust = s.read.parquet(t(d, "customer"))
      val ord = s.read.parquet(t(d, "orders"))
      val nat = s.read.parquet(t(d, "nation"))
      val reg = s.read.parquet(t(d, "region"))
      ord.join(cust, ord("o_custkey") === cust("c_custkey"))
        .join(broadcast(nat), cust("c_nationkey") === nat("n_nationkey"))
        .join(broadcast(reg), nat("n_regionkey") === reg("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(round(sum(col("o_totalprice")), 2).as("total"), count(lit(1)).as("n"))
        .orderBy("r_name")
    }),
    "q_topk_orders" -> ((s, d) =>
      s.read.parquet(t(d, "orders"))
        .select(col("o_orderkey"), round(col("o_totalprice"), 2).as("o_totalprice"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(10)),
    "q_distinct_agg" -> ((s, d) =>
      s.read.parquet(t(d, "orders"))
        .groupBy(col("o_orderstatus"))
        .agg(countDistinct(col("o_custkey")).as("custs"), count(lit(1)).as("n"))
        .orderBy("o_orderstatus")),
    "q_setop_except" -> ((s, d) => {
      val p = s.read.parquet(t(d, "part"))
      p.select("p_brand").distinct()
        .except(p.filter(col("p_size") > 25).select("p_brand").distinct())
        .orderBy("p_brand")
    }),
    "q_window_events" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id")).orderBy(col("value").desc, col("event_id").asc)
      s.read.parquet(t(d, "events"))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
        .orderBy("event_type")
    }),
    "q_events_hourly" -> ((s, d) =>
      s.read.parquet(t(d, "events"))
        .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(avg(col("value")), 4).as("avg_value"))
        .orderBy("hour", "event_type")),
    "q_docs_by_source" -> ((s, d) =>
      s.read.parquet(t(d, "documents"))
        .groupBy(col("source"), col("lang"))
        .agg(count(lit(1)).as("n"), round(avg(col("n_chars")), 3).as("avg_chars"))
        .orderBy("source", "lang")),

    "q_rollup" -> ((s, d) =>
      s.read.parquet(t(d, "orders"))
        .rollup(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("total"))
        .orderBy(col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)),
    "q_semi_anti" -> ((s, d) => {
      // semi+anti in ONE pass: left join against distinct order keys, then
      // a single aggregate — no second join and no crossJoin of the two
      // 1-row aggregates (that plan carried a BroadcastNestedLoopJoin)
      val c = s.read.parquet(t(d, "customer"))
      val o = s.read.parquet(t(d, "orders"))
      c.select("c_custkey")
        .join(o.select(col("o_custkey").as("c_custkey")).distinct()
                .withColumn("__has", lit(1)), Seq("c_custkey"), "left")
        .agg(sum(when(col("__has").isNotNull, 1L).otherwise(0L)).as("with_orders"),
             sum(when(col("__has").isNull, 1L).otherwise(0L)).as("without_orders"))
    }),
    "q_sessions" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts").asc, col("event_id").asc)
      s.read.parquet(t(d, "events"))
        .withColumn("prev_ts", lag(col("ts"), 1).over(w))
        .withColumn("new_session",
          when(col("prev_ts").isNull ||
               unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts")) > 1800, 1L).otherwise(0L))
        .groupBy(col("user_id")).agg(sum(col("new_session")).as("sessions"), count(lit(1)).as("events"))
        .agg(sum(col("sessions")).as("total_sessions"), sum(col("events")).as("total_events"),
             countDistinct(col("user_id")).as("users"))
    }),

    // ---- dedup family --------------------------------------------------------
    "dedup_exact" -> ((s, d) =>
      Dedup.exactGroups(s.read.parquet(t(d, "documents")), col("text"), "doc_id")
        .filter(col("n") > 1)
        .agg(count(lit(1)).as("dup_groups"), sum(col("n")).as("dup_rows"),
             min(col("keeper")).as("min_keeper"))),
    "dedup_exact_survivors" -> ((s, d) => {
      val df = s.read.parquet(t(d, "documents"))
      Dedup.exactKeepMin(df, col("text"), "doc_id")
        .agg(count(lit(1)).as("survivors"), sum(col("n_chars")).as("chars"))
    }),
    "dedup_minhash" -> ((s, d) =>
      Dedup.minhashNearDups(s.read.parquet(t(d, "documents")), "doc_id", "text",
        threshold = 0.8)
        .agg(count(lit(1)).as("pairs"),
             coalesce(round(avg(col("jaccard")), 4), lit(0.0)).as("avg_jaccard"))),
    "dedup_simhash" -> ((s, d) =>
      Dedup.simhashNearDups(s.read.parquet(t(d, "documents")), "doc_id", "text",
        maxHamming = 3)
        .agg(count(lit(1)).as("pairs"),
             coalesce(round(avg(col("hamming")), 4), lit(0.0)).as("avg_hamming"))),
    "dedup_ngram_jaccard" -> ((s, d) => {
      // pair generation via banded MinHash LSH (the operator this verifier
      // was designed for) — no cartesian/BroadcastNestedLoopJoin anywhere;
      // low-threshold banding (16 bands x 2 rows) casts a wide candidate net
      val docs = s.read.parquet(t(d, "documents"))
      val pairs = Dedup.minhashLshPairs(docs, "doc_id", "text",
        shingleK = 3, bands = 16, rowsPerBand = 2)
      Dedup.ngramJaccard(docs, pairs, "doc_id", "text", 3)
        .agg(count(lit(1)).as("pairs"), round(sum(col("jaccard")), 4).as("sum_jaccard"))
    }),
    "dedup_embedding" -> ((s, d) =>
      Dedup.embeddingNearDups(s.read.parquet(t(d, "embeddings")), "vec_id", "embedding",
        threshold = 0.92, planes = 12)
        .agg(count(lit(1)).as("pairs"),
             coalesce(round(avg(col("cosine")), 4), lit(0.0)).as("avg_cosine"))),

    // ---- similarity search ---------------------------------------------------
    "ann_brute_topk" -> ((s, d) => {
      val emb = s.read.parquet(t(d, "embeddings"))
      val q = emb.filter(col("vec_id") === 0).select("embedding")
        .collect()(0).getSeq[Float](0)
      Similarity.bruteForceTopK(emb.filter(col("vec_id") =!= 0), "vec_id", "embedding", q, 10)
        .withColumn("cosine", round(col("cosine"), 4))
    }),
    "ann_lsh_topk" -> ((s, d) => {
      val emb = s.read.parquet(t(d, "embeddings"))
      val first = emb.filter(col("vec_id") === 0).select("embedding").collect()(0)
      val q = first.getSeq[Float](0)
      Similarity.lshTopK(emb.filter(col("vec_id") =!= 0), "vec_id", "embedding",
        q, 10, planes = 10, dim = q.length)
        .withColumn("cosine", round(col("cosine"), 4))
    }),

    // ---- text analysis --------------------------------------------------------
    "text_tokens" -> ((s, d) =>
      s.read.parquet(t(d, "documents"))
        .select(col("doc_id"), TextStats.tokenCount(col("text")).as("tokens"),
                TextStats.bpeishCount(col("text")).as("bpeish"))
        .orderBy("doc_id")),
    "text_quality" -> ((s, d) =>
      s.read.parquet(t(d, "documents"))
        .select(col("doc_id"),
          TextStats.charCount(col("text")).as("chars"),
          round(TextStats.punctRatio(col("text")), 4).as("punct_ratio"),
          round(TextStats.meanWordLen(col("text")), 4).as("mean_word_len"))
        .orderBy("doc_id")),
    "text_quality_score" -> ((s, d) =>
      s.read.parquet(t(d, "documents"))
        .select(col("doc_id"), TextStats.qualityScore(col("text")).as("quality"))
        .groupBy(col("quality")).agg(count(lit(1)).as("n")).orderBy("quality")),
    "text_langid" -> ((s, d) =>
      s.read.parquet(t(d, "documents"))
        .select(TextStats.langId(col("text")).as("pred_lang"))
        .groupBy("pred_lang").agg(count(lit(1)).as("n")).orderBy("pred_lang")),
    "text_fingerprint" -> ((s, d) =>
      s.read.parquet(t(d, "documents"))
        .select(col("doc_id"), TextStats.fingerprint(col("text")).as("fp"))
        .agg(countDistinct(col("fp")).as("distinct_fps"), count(lit(1)).as("n"))),

    // ---- crawl / extraction operators -----------------------------------------
    "extract_html_parity" -> ((s, d) => {
      GraftFunctions.register(s)
      val wiki = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
        "/root/reference/webarchive/sample_data/Wikipedia.webarchive"))
      s.createDataFrame(Seq(("https://en.wikipedia.org/wiki/Main_Page", wiki)))
        .toDF("url", "html")
        .select(col("url"),
          length(GraftFunctions.extract_html(col("html"), col("url"))).as("extracted_chars"),
          sha2(GraftFunctions.extract_html(col("html"), col("url")).cast("binary"), 256).as("sha"),
          GraftFunctions.resource_count(col("html")).as("resources"))
    }),
    "crawl_outlinks" -> ((s, d) => {
      GraftFunctions.register(s)
      SyntheticCorpus.pages(s, 42L, 500L, 8).toDF()
        .select(GraftFunctions.url_canonicalize(col("url")).as("url"),
          size(GraftFunctions.extract_outlinks(col("html"), col("url"))).as("n_links"))
        .orderBy("url")
    }),
    "crawl_canonicalize" -> ((s, d) => {
      GraftFunctions.register(s)
      SyntheticCorpus.pages(s, 42L, 500L, 8).toDF()
        .select(GraftFunctions.url_canonicalize(upper(col("url"))).as("normalized"),
                GraftFunctions.url_host(GraftFunctions.url_canonicalize(col("url"))).as("host"))
        .groupBy("host").agg(count(lit(1)).as("n")).orderBy("host")
    }),
    "crawl_schedule" -> ((s, d) => {
      // end-to-end mini-crawl: 2 epochs on a 500-page corpus
      import graft.jobs.CrawlJob
      import graft.frontier.{SeenSet, Scheduler}
      val root = java.nio.file.Files.createTempDirectory("verify-crawl").toString
      val store = new graft.store.ParquetSnapshotStore(root)
      val cfg = CrawlJob.Config(
        seen = SeenSet.Config(numBuckets = 8, expectedPerBucket = 1 << 14),
        sched = Scheduler.Config(perHostBudget = 4, saltFactor = 4))
      val pages = CrawlJob.preparePages(SyntheticCorpus.pages(s, 42L, 500L, 8).toDF())
      val robots = SyntheticCorpus.robots(s, 42L).toDF()
      CrawlJob.init(s, store, SyntheticCorpus.seeds(s, 42L, 500L, 10), cfg)
      CrawlJob.runEpoch(s, store, pages, robots, cfg)
      CrawlJob.runEpoch(s, store, pages, robots, cfg)
      val snap = store.latest().get
      s.read.parquet(snap.tables("scheduled")).select("epoch", "seq", "url").orderBy("epoch", "seq")
    }),

    "extract_files_manifest" -> ((s, d) => {
      GraftFunctions.register(s)
      val wiki = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
        "/root/reference/webarchive/sample_data/Wikipedia.webarchive"))
      s.createDataFrame(Seq(("https://en.wikipedia.org/wiki/Main_Page", wiki)))
        .toDF("url", "html")
        .select(explode(GraftFunctions.extract_files(col("html"), lit("page.html"))).as("f"))
        .select(col("f.path"), col("f.sha256"), col("f.bytes"))
        .orderBy("path")
    }),
    "mime_classes" -> ((s, d) => {
      GraftFunctions.register(s)
      val wiki = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
        "/root/reference/webarchive/sample_data/Wikipedia.webarchive"))
      s.createDataFrame(Seq(("https://en.wikipedia.org/wiki/Main_Page", wiki)))
        .toDF("url", "html")
        .select(explode(GraftFunctions.parse_webarchive(col("html")).getField("subresources")).as("r"))
        .select(col("r.mime_type").as("mime"),
          GraftFunctions.is_html_mime(col("r.mime_type")).as("is_html"),
          GraftFunctions.is_text_mime(col("r.mime_type")).as("is_text"))
        .groupBy("mime", "is_html", "is_text").agg(count(lit(1)).as("n"))
        .orderBy("mime")
    }),

    // ---- multimodal: real image decode (ImageIO), stub audio/video ---------------
    "media_features" -> ((s, d) => {
      Multimodal.extractFeatures(s, Multimodal.syntheticMedia(s, 300L))
        .toDF()
        .groupBy(col("kind"))
        .agg(count(lit(1)).as("n"), sum(col("byte_len")).as("bytes"),
             countDistinct(col("content_hash")).as("distinct_hashes"),
             sum(when(col("ok"), 1L).otherwise(0L)).as("decoded_ok"),
             sum(col("width")).as("width_sum"), sum(col("height")).as("height_sum"))
        .orderBy("kind")
    }))

  /** DuckDB equivalents over the same parquet tables. Column names/aliases
    * match the Spark outputs exactly (the driver sorts columns by name
    * before hashing). Non-SQL-expressible operators are omitted -> the
    * driver records a rows-only check for them. */
  def oracleSql: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
         round(sum(l_quantity), 2) AS sum_qty,
         round(sum(l_extendedprice), 2) AS sum_base_price,
         round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
         count(*) AS count_order
         FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
         GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""",
    "q3_join" ->
      """SELECT l_orderkey, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         WHERE c_mktsegment = 'BUILDING'
         GROUP BY l_orderkey ORDER BY revenue DESC, l_orderkey ASC LIMIT 10""",
    "q5_broadcast" ->
      """SELECT r_name, round(sum(o_totalprice), 2) AS total, count(*) AS n
         FROM orders JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY r_name ORDER BY r_name""",
    "q_topk_orders" ->
      """SELECT o_orderkey, round(o_totalprice, 2) AS o_totalprice FROM orders
         ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""",
    "q_distinct_agg" ->
      """SELECT o_orderstatus, count(DISTINCT o_custkey) AS custs, count(*) AS n
         FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    "q_setop_except" ->
      """SELECT p_brand FROM part
         EXCEPT
         SELECT p_brand FROM part WHERE p_size > 25
         ORDER BY p_brand""",
    "q_window_events" ->
      """SELECT event_type, count(*) AS n, round(sum(value), 2) AS sum_value
         FROM (SELECT event_type, value,
                 row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id ASC) AS rk
               FROM events) WHERE rk <= 3
         GROUP BY event_type ORDER BY event_type""",
    "q_events_hourly" ->
      """SELECT date_trunc('hour', ts) AS hour, event_type, count(*) AS n,
         round(avg(value), 4) AS avg_value
         FROM events GROUP BY 1, 2 ORDER BY 1, 2""",
    "q_docs_by_source" ->
      """SELECT source, lang, count(*) AS n, round(avg(n_chars), 3) AS avg_chars
         FROM documents GROUP BY source, lang ORDER BY source, lang""",
    "q_rollup" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
         round(sum(o_totalprice), 2) AS total
         FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
         ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""",
    "q_semi_anti" ->
      """SELECT
         (SELECT count(*) FROM customer WHERE EXISTS
            (SELECT 1 FROM orders WHERE o_custkey = c_custkey)) AS with_orders,
         (SELECT count(*) FROM customer WHERE NOT EXISTS
            (SELECT 1 FROM orders WHERE o_custkey = c_custkey)) AS without_orders""",
    "q_sessions" ->
      """SELECT CAST(sum(sessions) AS BIGINT) AS total_sessions,
                CAST(sum(events) AS BIGINT) AS total_events,
                count(DISTINCT user_id) AS users
         FROM (SELECT user_id, sum(new_session) AS sessions, count(*) AS events
               FROM (SELECT user_id,
                       CASE WHEN prev_ts IS NULL
                              OR epoch(ts) - epoch(prev_ts) > 1800 THEN 1 ELSE 0 END AS new_session
                     FROM (SELECT user_id, ts, event_id,
                             lag(ts) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS prev_ts
                           FROM events))
               GROUP BY user_id)""",
    "dedup_exact" ->
      """SELECT count(*) AS dup_groups, CAST(sum(n) AS BIGINT) AS dup_rows, min(keeper) AS min_keeper
         FROM (SELECT count(*) AS n, min(doc_id) AS keeper FROM documents
               GROUP BY text HAVING count(*) > 1)""",
    "dedup_exact_survivors" ->
      """SELECT count(*) AS survivors, CAST(sum(n_chars) AS BIGINT) AS chars
         FROM (SELECT min(doc_id) AS doc_id FROM documents GROUP BY text) k
         JOIN documents USING (doc_id)""",
    "text_tokens" ->
      """SELECT doc_id, len(regexp_extract_all(text, '\S+')) AS tokens,
         len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]')) AS bpeish
         FROM documents ORDER BY doc_id""",
    "text_quality" ->
      """SELECT doc_id, length(text) AS chars,
         round(CASE WHEN length(regexp_replace(text, '\s+', '', 'g')) > 0
           THEN length(regexp_replace(text, '[^!-/:-@[-`{-~]', '', 'g'))::DOUBLE
                / length(regexp_replace(text, '\s+', '', 'g'))
           ELSE 0.0 END, 4) AS punct_ratio,
         round(CASE WHEN len(regexp_extract_all(text, '\S+')) > 0
           THEN length(regexp_replace(text, '\s+', '', 'g'))::DOUBLE
                / len(regexp_extract_all(text, '\S+'))
           ELSE 0.0 END, 4) AS mean_word_len
         FROM documents ORDER BY doc_id""")
}
