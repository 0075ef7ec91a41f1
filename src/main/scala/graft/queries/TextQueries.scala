package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.{Text, TextFunctions}
import graft.ops.Stats
import Q._

/** Text-analysis + dedup family over `documents`: token counting,
  * fingerprinting/exact dedup, language-ID heuristic, quality scoring,
  * stopword ratio, n-gram Jaccard near-dup pairs. All built from codegen'd
  * built-ins with byte-identical DuckDB formulations. */
object TextQueries {

  val queries: Map[String, QueryFn] = Map(
    "q34_token_count" -> ((s, dir) => {
      t(s, dir, "documents").select(
        col("doc_id"),
        Text.tokenCount(col("text")).cast("long").as("n_tokens"),
        length(Text.normText(col("text"))).cast("long").as("n_chars_norm"),
        Text.fingerprint(col("text")).as("fp"))
    }),

    // exact dedup via normalized-text fingerprint: one representative
    // (min doc_id) + group size per distinct content
    "q35_dedup_exact" -> ((s, dir) => {
      t(s, dir, "documents")
        .groupBy(Text.fingerprint(col("text")).as("fp"))
        .agg(min(col("doc_id")).as("keep_doc_id"), count(lit(1)).as("n_copies"))
    }),

    "q36_langid" -> ((s, dir) => {
      t(s, dir, "documents").select(
        col("doc_id"),
        Text.langId(col("text")).as("lang_pred"),
        Text.langScore(Text.normText(col("text")), Text.EnMarkers).cast("long").as("en_score"))
    }),

    "q37_quality" -> ((s, dir) => {
      t(s, dir, "documents").select(
        col("doc_id"),
        r6(Text.qualityScore(col("text"))).as("quality"),
        r6(Text.stopwordRatio(col("text"))).as("stopword_ratio"))
    }),

    // n-gram (token-set) Jaccard near-dup pairs within a source
    "q38_ngram_jaccard" -> ((s, dir) => {
      val d = t(s, dir, "documents")
        .where(col("doc_id") < 200)
        .select(col("doc_id"), col("source"),
          array_distinct(split(Text.normText(col("text")), " ")).as("toks"))
      val a = d.select(col("source"), col("doc_id").as("d1"), col("toks").as("t1"))
      val b = d.select(col("source"), col("doc_id").as("d2"), col("toks").as("t2"))
      a.join(b, Seq("source"))
        .where(col("d1") < col("d2"))
        .withColumn("inter", size(array_intersect(col("t1"), col("t2"))).cast("double"))
        .withColumn("jaccard",
          col("inter") / (size(col("t1")) + size(col("t2")) - col("inter")))
        .where(col("jaccard") >= 0.6)
        .select(col("source"), col("d1"), col("d2"), r6(col("jaccard")).as("jaccard"))
    }),

    // BPE-ish regex token counting alongside whitespace tokens (build brief:
    // "token counting (whitespace + a BPE-ish regex)")
    "q48_bpe_tokens" -> ((s, dir) => {
      t(s, dir, "documents").select(
        col("doc_id"),
        Text.tokenCount(col("text")).cast("long").as("ws_tokens"),
        Text.bpeTokenCount(col("text")).cast("long").as("bpe_tokens"))
    }),

    // rolling-hash document fingerprinting (MOSS winnowing): distinct
    // per-window shingle-hash minima; identical-content docs share the
    // full fingerprint set
    "q49_winnowing" -> ((s, dir) => {
      val fp = t(s, dir, "documents").select(
        col("doc_id"),
        Text.winnowFingerprints(Text.normText(col("text"))).as("fps"))
      fp.select(col("doc_id"),
        size(col("fps")).cast("long").as("n_fps"),
        when(size(col("fps")) > 0, array_min(col("fps"))).as("min_fp"),
        when(size(col("fps")) > 0, array_max(col("fps"))).as("max_fp"))
    }),

    // A10: the lyrics-battery analog over documents per source — syllable
    // count (tokens), syllabic ratio (chars-sung-per-syllable analog =
    // chars/token), voice presence (docs that carry text / all docs), and
    // register spread (`features/lyrics/handler.py:30-145`)
    "q47_caption_battery" -> ((s, dir) => {
      val d = t(s, dir, "documents").select(
        col("source"),
        Text.tokenCount(col("text")).cast("long").as("toks"),
        length(Text.normText(col("text"))).cast("long").as("chars"))
      d.groupBy(col("source")).agg(
        count(lit(1)).cast("bigint").as("n_docs"),
        sum(when(col("toks") > 0, 1).otherwise(0)).cast("bigint").as("n_with_text"),
        r6(sum(when(col("toks") > 0, 1).otherwise(0)).cast("double") / count(lit(1)))
          .as("presence"),
        sum(col("toks")).cast("bigint").as("n_syllables"),
        r6(Stats.safeDiv(sum(col("chars")).cast("double"), sum(col("toks")).cast("double")))
          .as("syllabic_ratio"),
        r6(stddev_samp(col("toks").cast("double"))).as("register_spread"))
    }),

    // LSH-candidate near-dup pairs VERIFIED by exact shingle Jaccard — the
    // DuckDB oracle computes ALL pairs >= threshold, so a hash match proves
    // the banded-LSH candidate stage has 100% recall at the threshold on
    // this corpus (k=32, 16 bands x 2 rows: P[miss | j=0.6] ~ 1.6e-4 per
    // pair, exact on this deterministic data — verified at sf0.01/sf0.001).
    // Bounded corpus (doc_id < 300 + injected dups) keeps the oracle's
    // all-pairs side feasible; the Spark side stays the bucket join.
    "q59_near_dup_verified" -> ((s, dir) => {
      val base = t(s, dir, "documents").where(col("doc_id") < 300)
        .select(col("doc_id"), Text.normText(col("text")).as("nt"))
      val dups = t(s, dir, "documents")
        .where(col("doc_id") < 300 && pmod(col("doc_id"), lit(25)) === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"),
          Text.normText(concat(col("text"), lit(" near duplicate suffix"))).as("nt"))
      val all = base.unionByName(dups)
        // shingles hashed to longs: set cardinalities (and so Jaccard) are
        // unchanged barring an xxhash64 collision inside one doc's ~150
        // shingles (P ~ 1e-15), and the candidate join then intersects
        // 8-byte longs instead of strings — ~3x cheaper, smaller shuffle
        .withColumn("sh", transform(Text.charShingles(col("nt")), x => xxhash64(x)))
        .withColumn("sig", TextFunctions.minhash(col("nt"), k = 32))
        .withColumn("bucket", explode(TextFunctions.lsh_bands(col("sig"), bands = 16)))
      // cap can't activate at this corpus size; it rides along so the SAME
      // formulation is the one that holds at scale (histogram broadcast is
      // safe here because the corpus — hence the bucket domain — is bounded
      // by construction; the unbounded q51 path keeps the shuffle join)
      val salted = graft.functions.Vectors.saltBuckets(all, "bucket", "doc_id",
        cap = 1024, broadcastSizes = true)
      val a = salted.select(col("bucket"), col("__salt"),
        col("doc_id").as("d1"), col("sh").as("sh1"))
      val b = salted.select(col("bucket"), col("__salt"),
        col("doc_id").as("d2"), col("sh").as("sh2"))
      a.join(b, Seq("bucket", "__salt"))
        .where(col("d1") < col("d2"))
        .withColumn("inter", size(array_intersect(col("sh1"), col("sh2"))).cast("double"))
        .withColumn("jaccard",
          col("inter") / (size(col("sh1")) + size(col("sh2")) - col("inter")))
        .where(col("jaccard") >= 0.6)
        .select(col("d1"), col("d2"), r6(col("jaccard")).as("jaccard"))
        .distinct()
    }),

    // SimHash algorithm-level gate over an independent token hash: q52's
    // production polyHash path now ALSO carries a direct DuckDB replay
    // oracle (SqlHash, round 4); this variant keeps verifying the
    // vote/threshold/bit-compose algorithm over the cross-engine 56-bit
    // md5-prefix token hash — per-bit votes (+1/-1),
    // bit set iff vote > 0 (Text.simHash64's strict-majority convention),
    // composed to one 56-bit signature per doc. Explode + ONE hash
    // aggregate with 56 conditional sums; partial agg applies, so at scale
    // the token explosion combines map-side.
    "q75_simhash_verified" -> ((s, dir) => {
      val toks = t(s, dir, "documents")
        .select(col("doc_id"),
          explode(split(Text.normText(col("text")), " ")).as("tok"))
        .where(length(col("tok")) > 0)
        .withColumn("th",
          conv(substring(md5(col("tok")), 1, 14), 16, 10).cast("long"))
      val bitSums = (0 until 56).map(i =>
        sum(when(shiftright(col("th"), i).bitwiseAND(1) === 1, 1)
          .otherwise(-1)).as(s"b$i"))
      val votes = toks.groupBy(col("doc_id"))
        .agg(count(lit(1)).cast("bigint").as("n_tokens"), bitSums: _*)
      val sim = (0 until 56).map(i =>
        when(col(s"b$i") > 0, lit(1L << i)).otherwise(lit(0L)))
        .reduce(_ + _)
      votes.select(col("doc_id"), col("n_tokens"), sim.as("simhash56"))
    }),

    // MinHash algorithm-level gate over an independent shingle hash (the
    // q75 pattern for the minhash layer): q50's production polyHash path
    // now ALSO carries a direct DuckDB replay oracle (SqlHash, round 4);
    // this variant keeps verifying the affine-permutation MinHash
    // algorithm over the cross-engine md5-56 shingle hash — lane i = min over shingles of
    // (a_i * (h mod P) + b_i) mod P with P = 2^31 - 1; hp < 2^31 and
    // a_i < 2^26 keep every product below 2^57, so both engines stay in
    // exact i64. Explode + ONE hash aggregate (32 min lanes); partial agg
    // combines the shingle explosion map-side, so the shape scales.
    "q86_minhash_verified" -> ((s, dir) => {
      // nt staged as a bound column: charShinglesRaw's lambda captures the
      // normalization, so fused it would re-run the regex once per shingle
      // position (and explode_outer so no inferred size-filter re-fuses
      // the stage — see q90)
      val sh = t(s, dir, "documents")
        .select(col("doc_id"), Text.normText(col("text")).as("nt"))
        .select(col("doc_id"),
          explode_outer(Text.charShingles(col("nt"))).as("s"))
        .where(col("s").isNotNull)
        .withColumn("hp",
          pmod(conv(substring(md5(col("s")), 1, 14), 16, 10).cast("long"),
            lit(MinHashP)))
      val lanes = MinHashParams.zipWithIndex.map { case ((a, b), i) =>
        min(pmod(col("hp") * lit(a) + lit(b), lit(MinHashP))).as(f"mh$i%02d")
      }
      sh.groupBy(col("doc_id"))
        .agg(count(lit(1)).cast("long").as("n_shingles"), lanes: _*)
    }),

    // Deterministic hash split: the corpus-sampling op every training run
    // starts with — split = first label whose cumulative weight share
    // exceeds md5-52(id || ':' || salt)/2^52 (52 bits: exact in double and
    // strictly < 1.0 — see Sampling.splitFraction). Pure per-row
    // expression, no RNG state, no shuffle; stable by id so a grown corpus
    // never moves an existing row across the eval boundary. Oracle
    // thresholds interpolate the SAME Scala-computed partial sums so
    // non-representable running sums can't straddle engines.
    "q88_hash_split" -> ((s, dir) =>
      graft.ops.Sampling.hashSplit(
        t(s, dir, "documents").select(col("doc_id")),
        col("doc_id"), SplitWeights)
        .select(col("doc_id"), col("split"))),

    // Per-source quality quota cap: keep the top-k docs per source ranked
    // by quality score — WITHOUT the low-cardinality windowed-sort trap
    // (sources are few; a plain row_number would sort each source's whole
    // corpus in one task). Sampling.topKPerGroup ranks within (source,
    // salt) first, so the final rank sees at most k·salts rows per source.
    // Ordering is total (quality DESC, doc_id ASC) so ranks are
    // deterministic cross-engine.
    "q89_quota_cap" -> ((s, dir) => {
      val d = t(s, dir, "documents").select(col("doc_id"), col("source"),
        r6(Text.qualityScore(col("text"))).as("quality"))
      graft.ops.Sampling.topKPerGroup(d, Seq("source"),
        Seq(col("quality").desc, col("doc_id").asc),
        saltBy = col("doc_id"), k = 25)
    }),

    // Benchmark decontamination: docs with doc_id % 17 == 0 act as the
    // held-out eval set; every training doc sharing ANY 5-token shingle
    // with it (the C4/GPT-3-style n-gram-overlap rule) is dropped. Token
    // n-grams, not char winnowing: on a templated corpus an 8-char run is
    // shared by everything (0 rows survive), while 5-token sequences
    // isolate the genuinely copied docs. The eval fingerprint set is
    // benchmark-sized and broadcast, so the corpus is never shuffled by
    // fingerprint.
    "q90_decontaminate" -> ((s, dir) => {
      // token array STAGED as a bound column (referenced 4x below, which
      // blocks CollapseProject): fused, the lambda would recompute the
      // split+regex once per shingle position — O(len²) per row
      val d = t(s, dir, "documents")
        .select(col("doc_id"), split(Text.normText(col("text")), " ").as("ts"))
        .select(col("doc_id"),
          when(size(col("ts")) >= 5,
            array_distinct(transform(sequence(lit(0), size(col("ts")) - 5),
              i => array_join(slice(col("ts"), i + lit(1), lit(5)), " "))))
            .otherwise(array().cast("array<string>")).as("fps"))
      val isEval = pmod(col("doc_id"), lit(17L)) === 0
      // explode_outer for the same reason as Dedup.decontaminate: a plain
      // explode's inferred size-filter would push through the stages and
      // re-fuse the tree; the null fp from empty arrays never matches a
      // candidate fingerprint
      val evalFps = d.where(isEval).select(explode_outer(col("fps")).as("fp"))
        .where(col("fp").isNotNull)
      graft.ops.Dedup.decontaminate(d.where(!isEval), "doc_id", "fps", evalFps)
        .select(col("doc_id"))
    }),

    // Dedup CLUSTERS: connected components over the VERIFIED near-dup graph
    // (q59's formulation — LSH candidates, exact hashed-shingle Jaccard
    // >= 0.6 — with a SECOND injected copy per original so components
    // exceed pairs), labeled by min-id via Dedup.connectedComponents and
    // sized. The step a real dedup pipeline needs beyond pairwise
    // candidates: keep one representative per component, not per pair.
    // Oracle = DuckDB all-pairs exact Jaccard edges + a recursive CTE
    // computing the same min-reachable-id labels. Same pinned-corpus triage
    // note as q59: a mismatch on other data is an LSH-recall miss first.
    "q85_dedup_clusters" -> ((s, dir) => {
      val base = t(s, dir, "documents").where(col("doc_id") < 300)
        .select(col("doc_id"), Text.normText(col("text")).as("nt"))
      def dup(offset: Long, suffix: String) = t(s, dir, "documents")
        .where(col("doc_id") < 300 && pmod(col("doc_id"), lit(25)) === 0)
        .select((col("doc_id") + offset).as("doc_id"),
          Text.normText(concat(col("text"), lit(suffix))).as("nt"))
      val all = base
        .unionByName(dup(1000000L, " near duplicate suffix"))
        .unionByName(dup(2000000L, " almost identical suffix"))
        .withColumn("sh", transform(Text.charShingles(col("nt")), x => xxhash64(x)))
        .withColumn("sig", TextFunctions.minhash(col("nt"), k = 32))
        .withColumn("bucket", explode(TextFunctions.lsh_bands(col("sig"), bands = 16)))
      val salted = graft.functions.Vectors.saltBuckets(all, "bucket", "doc_id",
        cap = 1024, broadcastSizes = true)
      val a = salted.select(col("bucket"), col("__salt"),
        col("doc_id").as("d1"), col("sh").as("sh1"))
      val b = salted.select(col("bucket"), col("__salt"),
        col("doc_id").as("d2"), col("sh").as("sh2"))
      val edges = a.join(b, Seq("bucket", "__salt"))
        .where(col("d1") < col("d2"))
        .withColumn("inter", size(array_intersect(col("sh1"), col("sh2"))).cast("double"))
        .where(col("inter") /
          (size(col("sh1")) + size(col("sh2")) - col("inter")) >= 0.6)
        .select(col("d1").as("a"), col("d2").as("b")).distinct()
      val cc = graft.ops.Dedup.connectedComponents(edges)
      val sizes = cc.groupBy(col("cluster_rep"))
        .agg(count(lit(1)).cast("long").as("cluster_size"))
      cc.join(sizes, Seq("cluster_rep"))
        .select(col("id").as("doc_id"), col("cluster_rep"), col("cluster_size"))
    }),

  // Gopher-style within-document repetition signals — the quality family's
  // missing leg (q37 scores length/diversity; this scores REPETITION): the
  // distinct-token ratio, the share of 2-gram occurrences taken by the most
  // frequent 2-gram, and the share of 3-gram occurrences whose gram repeats
  // (the "fraction of characters in duplicate n-grams" rule, token-counted).
  // Shape: explode -> (doc, gram) hash agg -> (doc) hash agg — partial agg
  // combines the gram explosion map-side, so the shape scales; no windows.
  "q92_repetition" -> ((s, dir) =>
    repetitionSignals(t(s, dir, "documents")
      .select(col("doc_id"), Text.normText(col("text")).as("nt")))),

  // PII scrub: the redaction pass a web-scale corpus runs before training.
  // Deterministic PII (email + phone + IP built from the doc id) is
  // injected by BOTH engines into doc_id % 13 == 0 rows, then counted and
  // replaced in the order email -> IP -> phone (emails and IPs contain
  // digit runs, so the order is load-bearing). Patterns are RE2-safe so
  // Java regex and DuckDB agree; the scrub is verified by md5 fingerprint
  // of the redacted text, not just counts. Pure per-row codegen'd
  // expressions — no shuffle at all.
  "q93_pii_scrub" -> ((s, dir) => {
    val pii = concat(lit(" contact user"), col("doc_id").cast("string"),
      lit("@mail.example.org or call 555"),
      lpad(pmod(col("doc_id") * 7, lit(10000L)).cast("string"), 4, "0"),
      lit("99 from 10.0."), pmod(col("doc_id"), lit(256L)).cast("string"),
      lit(".7"))
    val txt = when(pmod(col("doc_id"), lit(13L)) === 0,
      concat(Text.normText(col("text")), pii))
      .otherwise(Text.normText(col("text")))
    val email = PiiEmail
    val ip = PiiIp
    val phone = PiiPhone
    val scrubbed = regexp_replace(
      regexp_replace(regexp_replace(txt, email, "<EMAIL>"), ip, "<IP>"),
      phone, "<PHONE>")
    t(s, dir, "documents").select(col("doc_id"),
      size(regexp_extract_all(txt, lit(email), lit(0))).cast("long").as("n_emails"),
      size(regexp_extract_all(txt, lit(ip), lit(0))).cast("long").as("n_ips"),
      size(regexp_extract_all(txt, lit(phone), lit(0))).cast("long").as("n_phones"),
      length(scrubbed).cast("long").as("scrub_len"),
      md5(scrubbed).as("scrub_fp"))
  }),

  // Training-sequence packing: concatenate each hash-bucket's doc stream
  // and cut every B=256 tokens (sized so the sf0.01 corpus genuinely crosses pack boundaries) (the GPT-style pack-and-chunk pretraining
  // layout) — each doc gets its pack id, offset in the pack, and how many
  // chunk boundaries it straddles. All arithmetic is exact-integer (div,
  // not floating floor) so both engines agree bit-for-bit. Scale shape:
  // ONE window per hash bucket (bucket count = shuffle width at scale), a
  // running sum over rows — no global sort, no driver state.
  "q94_seq_pack" -> ((s, dir) => {
    val d = t(s, dir, "documents").select(col("doc_id"),
      Text.tokenCount(col("text")).cast("long").as("toks"))
    graft.ops.Sampling.packSequences(d, col("doc_id"), col("toks"),
        nBuckets = 32, budget = 256)
      .select(col("doc_id"), col("bucket"), col("toks"),
        col("pack_id"), col("pack_offset"), col("n_chunks"))
  }),

  // Cross-document SHARED-PASSAGE detection (the MOSS plagiarism-pair /
  // copied-boilerplate semantics, distinct from q90's anti-join vs an eval
  // set): docs sharing >= 2 distinct 5-token shingles pair up with their
  // overlap count. Shingles with document frequency > 50 are dropped
  // first — stop-shingle removal, which is simultaneously the correctness
  // choice (boilerplate is not a copied passage) and the scale choice (it
  // bounds the per-shingle join fan-out, so the pair join can't go
  // quadratic on a templated corpus). A spliced 20-token excerpt of every
  // doc_id % 40 == 0 doc is injected so true copied passages exist; the
  // corpus is bounded (doc_id < 300) to keep the oracle's all-pairs
  // intersection feasible.
  "q97_shared_passages" -> ((s, dir) => {
    val base = t(s, dir, "documents").where(col("doc_id") < 300)
      .select(col("doc_id"), split(Text.normText(col("text")), " ").as("ts"))
    val spliced = base.where(pmod(col("doc_id"), lit(40L)) === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"),
        concat(slice(col("ts"), 6, 20),
          array(lit("spliced"), lit("tail"))).as("ts"))
    val fps = base.unionByName(spliced)
      .select(col("doc_id"),
        explode_outer(when(size(col("ts")) >= 5,
          array_distinct(transform(sequence(lit(0), size(col("ts")) - 5),
            i => array_join(slice(col("ts"), i + lit(1), lit(5)), " "))))
          .otherwise(array().cast("array<string>"))).as("fp"))
      .where(col("fp").isNotNull)
    val rare = fps.groupBy("fp")
      .agg(count(lit(1)).as("df")).where(col("df") <= 50).select("fp")
    val kept = fps.join(rare, Seq("fp"))
    val a = kept.select(col("fp"), col("doc_id").as("d1"))
    val b = kept.select(col("fp"), col("doc_id").as("d2"))
    a.join(b, Seq("fp"))
      .where(col("d1") < col("d2"))
      .groupBy(col("d1"), col("d2"))
      .agg(count(lit(1)).as("n_shared"))
      .where(col("n_shared") >= 2)
  }),

  // C4/Gopher-style keep/drop DECISION layer: named quality rules
  // (length, diversity, repetition, word shape, stopword presence)
  // composed over the q37/q92 signal families, every drop attributable to
  // its ';'-joined reason list (the text-side ErrorChannel). Thresholds
  // are the QualityFilter defaults; both engines compute the identical
  // signal expression trees so boundary comparisons agree.
  "q96_quality_filter" -> ((s, dir) =>
    graft.ops.QualityFilter.classify(
      t(s, dir, "documents")
        .select(col("doc_id"), Text.normText(col("text")).as("nt")))))

  /** q92's body — the op lives in [[graft.ops.Repetition]]; kept as an
    * alias for the randomized spec and q92/q96. */
  private[graft] def repetitionSignals(docs: org.apache.spark.sql.DataFrame) =
    graft.ops.Repetition.signals(docs)

  /** PII patterns shared verbatim by the Spark side and the DuckDB oracle
    * (RE2-safe: no backrefs/lookaround, so Java regex and RE2 agree). */
  private[queries] final val PiiEmail = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  private[queries] final val PiiIp =
    "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"
  private[queries] final val PiiPhone = "[0-9]{7,}"

  /** Split weights shared by q88's Spark side and its oracle — one Seq so
    * the cumulative thresholds agree bit-for-bit. */
  private val SplitWeights = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)

  /** Cross-engine MinHash permutation parameters (a_i, b_i) over the prime
    * modulus P = 2^31 - 1 — ONE Seq generates both the Spark aggregates and
    * the DuckDB mirror (the Dims-oracle pattern), so q86 is byte-exact by
    * construction. a_i nonzero and < 2^26. */
  private val MinHashP = 2147483647L
  private val MinHashParams: Seq[(Long, Long)] =
    (0 until 32).map { i =>
      ((1000003L * (i + 1)) % MinHashP, (12345L + 999331L * i) % MinHashP)
    }

  // exact whole-token count, mirroring Text.tokenOccurrences (split+filter)
  private def occSql(normExpr: String, word: String): String =
    s"len(list_filter(string_split($normExpr, ' '), x -> x = '$word'))::INT"
  private def scoreSql(markers: Seq[String]): String =
    markers.map(w => occSql("nt", w)).mkString(" + ")

  val oracles: Map[String, String] = {
    val norm = sqlNorm("text")
    Map(
      "q92_repetition" ->
        s"""WITH d AS (
           | SELECT doc_id, string_split(nt, ' ') AS ts
           | FROM (SELECT doc_id, $norm AS nt FROM documents)
           | WHERE length(nt) > 0),
           |e2 AS (
           | SELECT doc_id,
           |  unnest([ts[i+1] || ' ' || ts[i+2] for i in range(0, len(ts) - 1)]) AS g
           | FROM d WHERE len(ts) >= 2),
           |c2 AS (SELECT doc_id, g, count(*) AS c FROM e2 GROUP BY 1, 2),
           |g2 AS (SELECT doc_id, max(c) AS top2, sum(c) AS n2 FROM c2 GROUP BY 1),
           |e3 AS (
           | SELECT doc_id,
           |  unnest([ts[i+1] || ' ' || ts[i+2] || ' ' || ts[i+3]
           |    for i in range(0, len(ts) - 2)]) AS g
           | FROM d WHERE len(ts) >= 3),
           |c3 AS (SELECT doc_id, g, count(*) AS c FROM e3 GROUP BY 1, 2),
           |g3 AS (SELECT doc_id,
           |  sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS dup3, sum(c) AS n3
           | FROM c3 GROUP BY 1)
           |SELECT d.doc_id, len(ts)::BIGINT AS n_tokens,
           | round(len(list_distinct(ts))::DOUBLE / len(ts) + 3.7e-10, 6) AS distinct_ratio,
           | round(coalesce(top2::DOUBLE / n2, 0) + 3.7e-10, 6) AS top2gram_frac,
           | round(coalesce(dup3::DOUBLE / n3, 0) + 3.7e-10, 6) AS dup3gram_frac
           |FROM d LEFT JOIN g2 USING (doc_id) LEFT JOIN g3 USING (doc_id)""".stripMargin,

      "q97_shared_passages" ->
        s"""WITH base AS (
           | SELECT doc_id, string_split($norm, ' ') AS ts
           | FROM documents WHERE doc_id < 300),
           |allx AS (
           | SELECT doc_id, ts FROM base
           | UNION ALL
           | SELECT doc_id + 1000000 AS doc_id,
           |  ts[6:25] || ['spliced', 'tail'] AS ts
           | FROM base WHERE doc_id % 40 = 0),
           |sh AS (
           | SELECT doc_id,
           |  CASE WHEN len(ts) >= 5 THEN
           |   list_distinct([array_to_string(ts[i+1:i+5], ' ')
           |     for i in range(0, len(ts) - 4)])
           |  ELSE [] END AS fps
           | FROM allx),
           |f AS (SELECT doc_id, unnest(fps) AS fp FROM sh),
           |rare AS (SELECT fp FROM f GROUP BY fp HAVING count(*) <= 50),
           |k AS (SELECT f.doc_id, f.fp FROM f JOIN rare USING (fp)),
           |p AS (
           | SELECT a.doc_id AS d1, b.doc_id AS d2, count(*)::BIGINT AS n_shared
           | FROM k a JOIN k b ON a.fp = b.fp AND a.doc_id < b.doc_id
           | GROUP BY 1, 2)
           |SELECT d1, d2, n_shared FROM p WHERE n_shared >= 2""".stripMargin,

      "q96_quality_filter" ->
        s"""WITH src AS (SELECT doc_id, $norm AS nt FROM documents),
           |base AS (
           | SELECT doc_id, nt,
           |  (CASE WHEN length(nt) = 0 THEN 0
           |    ELSE len(string_split(nt, ' ')) END)::BIGINT AS toks,
           |  (${scoreSql(Text.EnMarkers)})::BIGINT AS stopwords,
           |  length(nt)::BIGINT AS chars
           | FROM src),
           |d AS (SELECT doc_id, string_split(nt, ' ') AS ts
           |      FROM src WHERE length(nt) > 0),
           |e2 AS (
           | SELECT doc_id,
           |  unnest([ts[i+1] || ' ' || ts[i+2] for i in range(0, len(ts) - 1)]) AS g
           | FROM d WHERE len(ts) >= 2),
           |c2 AS (SELECT doc_id, g, count(*) AS c FROM e2 GROUP BY 1, 2),
           |g2 AS (SELECT doc_id, max(c) AS top2, sum(c) AS n2 FROM c2 GROUP BY 1),
           |e3 AS (
           | SELECT doc_id,
           |  unnest([ts[i+1] || ' ' || ts[i+2] || ' ' || ts[i+3]
           |    for i in range(0, len(ts) - 2)]) AS g
           | FROM d WHERE len(ts) >= 3),
           |c3 AS (SELECT doc_id, g, count(*) AS c FROM e3 GROUP BY 1, 2),
           |g3 AS (SELECT doc_id,
           |  sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS dup3, sum(c) AS n3
           | FROM c3 GROUP BY 1),
           |sig AS (
           | SELECT d.doc_id,
           |  round(len(list_distinct(ts))::DOUBLE / len(ts) + 3.7e-10, 6) AS distinct_ratio,
           |  round(coalesce(top2::DOUBLE / n2, 0) + 3.7e-10, 6) AS top2gram_frac,
           |  round(coalesce(dup3::DOUBLE / n3, 0) + 3.7e-10, 6) AS dup3gram_frac
           | FROM d LEFT JOIN g2 USING (doc_id) LEFT JOIN g3 USING (doc_id)),
           |j AS (
           | SELECT b.doc_id, b.toks, b.stopwords, b.chars,
           |  s.distinct_ratio, s.top2gram_frac, s.dup3gram_frac
           | FROM base b LEFT JOIN sig s USING (doc_id)),
           |r AS (
           | SELECT doc_id, toks AS n_tokens,
           |  coalesce(array_to_string(list_filter([
           |   CASE WHEN coalesce(toks, 0) = 0 THEN 'empty' END,
           |   CASE WHEN toks > 0 AND toks < 5 THEN 'too_few_tokens' END,
           |   CASE WHEN toks > 1000 THEN 'too_many_tokens' END,
           |   CASE WHEN distinct_ratio < 0.3 THEN 'low_distinct_ratio' END,
           |   CASE WHEN toks >= 10 AND top2gram_frac > 0.2 THEN 'high_top2gram' END,
           |   CASE WHEN toks >= 10 AND dup3gram_frac > 0.2 THEN 'high_dup3gram' END,
           |   CASE WHEN toks > 0 AND ((chars - (toks - 1))::DOUBLE / toks < 2.0
           |     OR (chars - (toks - 1))::DOUBLE / toks > 12.0) THEN 'word_length' END,
           |   CASE WHEN toks > 0 AND stopwords < 1 THEN 'low_stopword' END
           |  ], x -> x IS NOT NULL), ';'), '') AS reasons
           | FROM j)
           |SELECT doc_id, n_tokens, reasons, (reasons = '') AS keep FROM r""".stripMargin,

      "q93_pii_scrub" ->
        s"""WITH base AS (
           | SELECT doc_id,
           |  CASE WHEN doc_id % 13 = 0 THEN $norm || ' contact user' ||
           |    doc_id::VARCHAR || '@mail.example.org or call 555' ||
           |    lpad(((doc_id * 7) % 10000)::VARCHAR, 4, '0') ||
           |    '99 from 10.0.' || (doc_id % 256)::VARCHAR || '.7'
           |   ELSE $norm END AS txt
           | FROM documents),
           |s AS (
           | SELECT doc_id, txt,
           |  regexp_replace(regexp_replace(regexp_replace(txt,
           |    '$PiiEmail', '<EMAIL>', 'g'),
           |    '$PiiIp', '<IP>', 'g'),
           |    '$PiiPhone', '<PHONE>', 'g') AS scrubbed
           | FROM base)
           |SELECT doc_id,
           | len(regexp_extract_all(txt, '$PiiEmail'))::BIGINT AS n_emails,
           | len(regexp_extract_all(txt, '$PiiIp'))::BIGINT AS n_ips,
           | len(regexp_extract_all(txt, '$PiiPhone'))::BIGINT AS n_phones,
           | length(scrubbed)::BIGINT AS scrub_len,
           | md5(scrubbed) AS scrub_fp
           |FROM s""".stripMargin,

      "q94_seq_pack" ->
        s"""WITH d AS (
           | SELECT doc_id,
           |  (CASE WHEN length($norm) = 0 THEN 0
           |    ELSE len(string_split($norm, ' ')) END)::BIGINT AS toks,
           |  ('0x' || substr(md5(doc_id::VARCHAR), 1, 14))::BIGINT % 32 AS bucket
           | FROM documents),
           |w AS (
           | SELECT doc_id, bucket, toks,
           |  coalesce(sum(toks) OVER (PARTITION BY bucket ORDER BY doc_id
           |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start_tok
           | FROM d)
           |SELECT doc_id, bucket, toks,
           | (start_tok // 256)::BIGINT AS pack_id,
           | (start_tok % 256)::BIGINT AS pack_offset,
           | (CASE WHEN toks = 0 THEN 0
           |   ELSE ((start_tok + toks - 1) // 256) - (start_tok // 256) + 1
           |  END)::BIGINT AS n_chunks
           |FROM w""".stripMargin,
      "q34_token_count" ->
        s"""SELECT doc_id,
           | (CASE WHEN length($norm) = 0 THEN 0
           |   ELSE len(string_split($norm, ' ')) END)::BIGINT AS n_tokens,
           | length($norm)::BIGINT AS n_chars_norm,
           | md5($norm) AS fp
           |FROM documents""".stripMargin,

      "q35_dedup_exact" ->
        s"""SELECT md5($norm) AS fp, min(doc_id) AS keep_doc_id,
           | count(*)::BIGINT AS n_copies
           |FROM documents GROUP BY 1""".stripMargin,

      "q36_langid" ->
        s"""WITH n AS (SELECT doc_id, $norm AS nt FROM documents),
           |s AS (SELECT doc_id,
           |  ${scoreSql(Text.EnMarkers)} AS en_s,
           |  ${scoreSql(Text.DeMarkers)} AS de_s,
           |  ${scoreSql(Text.FrMarkers)} AS fr_s
           | FROM n)
           |SELECT doc_id,
           | CASE WHEN en_s = 0 AND de_s = 0 AND fr_s = 0 THEN 'und'
           |      WHEN en_s >= de_s AND en_s >= fr_s THEN 'en'
           |      WHEN de_s >= fr_s THEN 'de' ELSE 'fr' END AS lang_pred,
           | en_s::BIGINT AS en_score
           |FROM s""".stripMargin,

      "q37_quality" ->
        s"""WITH n AS (
           | SELECT doc_id, $norm AS nt FROM documents),
           |m AS (
           | SELECT doc_id, nt,
           |  (CASE WHEN length(nt) = 0 THEN 0
           |    ELSE len(string_split(nt, ' ')) END)::DOUBLE AS toks,
           |  len(list_distinct(string_split(nt, ' ')))::DOUBLE AS dtoks
           | FROM n)
           |SELECT doc_id,
           | round(CASE WHEN toks = 0 THEN 0
           |  ELSE 0.4 * least(1.0, toks / 100.0)
           |     + 0.3 * (dtoks / toks)
           |     + 0.3 * least(1.0, ((length(nt) - (toks - 1)) / toks) / 8.0) END + 3.7e-10, 6) AS quality,
           | round(CASE WHEN toks = 0 THEN 0
           |  ELSE (${scoreSql(Text.EnMarkers)}) / toks END + 3.7e-10, 6) AS stopword_ratio
           |FROM m""".stripMargin,

      "q38_ngram_jaccard" ->
        s"""WITH d AS (
           | SELECT doc_id, source,
           |  list_distinct(string_split($norm, ' ')) AS toks
           | FROM documents WHERE doc_id < 200),
           |p AS (
           | SELECT a.source, a.doc_id AS d1, b.doc_id AS d2,
           |  len(list_intersect(a.toks, b.toks))::DOUBLE AS inter,
           |  len(a.toks) AS la, len(b.toks) AS lb
           | FROM d a JOIN d b ON a.source = b.source AND a.doc_id < b.doc_id)
           |SELECT source, d1, d2,
           | round(inter / (la + lb - inter) + 3.7e-10, 6) AS jaccard
           |FROM p WHERE inter / (la + lb - inter) >= 0.6""".stripMargin,

      "q48_bpe_tokens" ->
        s"""SELECT doc_id,
           | (CASE WHEN length($norm) = 0 THEN 0
           |   ELSE len(string_split($norm, ' ')) END)::BIGINT AS ws_tokens,
           | len(regexp_extract_all($norm,
           |   ' ?[a-z]+| ?[0-9]+| ?[^a-z0-9 ]+'))::BIGINT AS bpe_tokens
           |FROM documents""".stripMargin,

      "q49_winnowing" ->
        s"""WITH d AS (SELECT doc_id, $norm AS nt FROM documents),
           |h AS (
           | SELECT doc_id,
           |  list_transform(
           |    list_transform(range(1, length(nt) - 3), i -> nt[i:i+4]),
           |    s -> md5(s)) AS hs
           | FROM d),
           |w AS (
           | SELECT doc_id,
           |  CASE WHEN len(hs) >= 4 THEN
           |    list_distinct(list_transform(range(1, len(hs) - 2),
           |      i -> list_aggregate(hs[i:i+3], 'min')))
           |  WHEN len(hs) > 0 THEN [list_aggregate(hs, 'min')]
           |  ELSE [] END AS fps
           | FROM h)
           |SELECT doc_id, len(fps)::BIGINT AS n_fps,
           | CASE WHEN len(fps) > 0 THEN list_aggregate(fps, 'min') END AS min_fp,
           | CASE WHEN len(fps) > 0 THEN list_aggregate(fps, 'max') END AS max_fp
           |FROM w""".stripMargin,

      "q47_caption_battery" ->
        s"""WITH d AS (
           | SELECT source,
           |  (CASE WHEN length($norm) = 0 THEN 0
           |    ELSE len(string_split($norm, ' ')) END)::BIGINT AS toks,
           |  length($norm)::BIGINT AS chars
           | FROM documents)
           |SELECT source, count(*)::BIGINT AS n_docs,
           | sum(CASE WHEN toks > 0 THEN 1 ELSE 0 END)::BIGINT AS n_with_text,
           | round(sum(CASE WHEN toks > 0 THEN 1 ELSE 0 END)::DOUBLE / count(*)
           |   + 3.7e-10, 6) AS presence,
           | sum(toks)::BIGINT AS n_syllables,
           | round(CASE WHEN sum(toks) <> 0
           |   THEN sum(chars)::DOUBLE / sum(toks) ELSE 0 END + 3.7e-10, 6) AS syllabic_ratio,
           | round(stddev(toks::DOUBLE) + 3.7e-10, 6) AS register_spread
           |FROM d GROUP BY 1""".stripMargin,

      // ALL pairs at exact shingle Jaccard >= 0.6 — the Spark side must
      // surface every one of them through the LSH candidate stage
      "q59_near_dup_verified" ->
        s"""WITH base AS (
           | SELECT doc_id, $norm AS nt FROM documents WHERE doc_id < 300
           | UNION ALL
           | SELECT doc_id + 1000000 AS doc_id,
           |  ${sqlNorm("(text || ' near duplicate suffix')")} AS nt
           | FROM documents WHERE doc_id < 300 AND doc_id % 25 = 0),
           |d AS (
           | SELECT doc_id,
           |  list_distinct(list_transform(range(1, length(nt) - 3),
           |    i -> nt[i:i+4])) AS sh
           | FROM base),
           |p AS (
           | SELECT a.doc_id AS d1, b.doc_id AS d2,
           |  len(list_intersect(a.sh, b.sh))::DOUBLE AS inter,
           |  len(a.sh) AS la, len(b.sh) AS lb
           | FROM d a JOIN d b ON a.doc_id < b.doc_id)
           |SELECT d1, d2, round(inter / (la + lb - inter) + 3.7e-10, 6) AS jaccard
           |FROM p WHERE inter / (la + lb - inter) >= 0.6""".stripMargin,

      "q85_dedup_clusters" ->
        s"""WITH RECURSIVE base AS (
           | SELECT doc_id, $norm AS nt FROM documents WHERE doc_id < 300
           | UNION ALL
           | SELECT doc_id + 1000000 AS doc_id,
           |  ${sqlNorm("(text || ' near duplicate suffix')")} AS nt
           | FROM documents WHERE doc_id < 300 AND doc_id % 25 = 0
           | UNION ALL
           | SELECT doc_id + 2000000 AS doc_id,
           |  ${sqlNorm("(text || ' almost identical suffix')")} AS nt
           | FROM documents WHERE doc_id < 300 AND doc_id % 25 = 0),
           |d AS (
           | SELECT doc_id,
           |  list_distinct(list_transform(range(1, length(nt) - 3),
           |    i -> nt[i:i+4])) AS sh
           | FROM base),
           |p AS (
           | SELECT x.doc_id AS a, y.doc_id AS b
           | FROM d x JOIN d y ON x.doc_id < y.doc_id
           | WHERE len(list_intersect(x.sh, y.sh))::DOUBLE /
           |   (len(x.sh) + len(y.sh) - len(list_intersect(x.sh, y.sh))) >= 0.6),
           |sym AS (SELECT a, b FROM p UNION ALL SELECT b AS a, a AS b FROM p),
           |reach AS (
           | SELECT DISTINCT a AS id, a AS lbl FROM sym
           | UNION
           | SELECT s.a AS id, r.lbl FROM sym s JOIN reach r ON r.id = s.b),
           |lab AS (SELECT id, min(lbl) AS cluster_rep FROM reach GROUP BY id)
           |SELECT id AS doc_id, cluster_rep,
           | count(*) OVER (PARTITION BY cluster_rep)::BIGINT AS cluster_size
           |FROM lab""".stripMargin,

      "q88_hash_split" -> {
        val cums = graft.ops.Sampling.cumulativeShares(SplitWeights)
        val cases = SplitWeights.init.zip(cums.init).map { case ((l, _), hi) =>
          s"WHEN f < $hi THEN '$l'"
        }.mkString(" ")
        s"""SELECT doc_id,
           | CASE $cases ELSE '${SplitWeights.last._1}' END AS split
           |FROM (SELECT doc_id,
           |  ('0x' || substr(md5(doc_id::VARCHAR || ':split'), 1, 13))::BIGINT
           |    / 4503599627370496.0 AS f
           | FROM documents) t""".stripMargin
      },

      "q89_quota_cap" ->
        s"""WITH n AS (
           | SELECT doc_id, source, $norm AS nt FROM documents),
           |m AS (
           | SELECT doc_id, source, nt,
           |  (CASE WHEN length(nt) = 0 THEN 0
           |    ELSE len(string_split(nt, ' ')) END)::DOUBLE AS toks,
           |  len(list_distinct(string_split(nt, ' ')))::DOUBLE AS dtoks
           | FROM n),
           |q AS (
           | SELECT doc_id, source,
           |  round(CASE WHEN toks = 0 THEN 0
           |   ELSE 0.4 * least(1.0, toks / 100.0)
           |      + 0.3 * (dtoks / toks)
           |      + 0.3 * least(1.0, ((length(nt) - (toks - 1)) / toks) / 8.0) END + 3.7e-10, 6) AS quality
           | FROM m),
           |r AS (
           | SELECT doc_id, source, quality,
           |  row_number() OVER (PARTITION BY source
           |    ORDER BY quality DESC, doc_id) AS rank
           | FROM q)
           |SELECT doc_id, source, quality, rank::INT AS rank
           |FROM r WHERE rank <= 25""".stripMargin,

      "q90_decontaminate" ->
        s"""WITH tk AS (
           | SELECT doc_id, string_split($norm, ' ') AS ts FROM documents),
           |w AS (
           | SELECT doc_id,
           |  CASE WHEN len(ts) >= 5 THEN
           |    list_distinct(list_transform(range(1, len(ts) - 3),
           |      i -> array_to_string(ts[i:i+4], ' ')))
           |  ELSE [] END AS fps
           | FROM tk),
           |e AS (SELECT DISTINCT unnest(fps) AS fp FROM w WHERE doc_id % 17 = 0),
           |c AS (
           | SELECT DISTINCT doc_id FROM
           |  (SELECT doc_id, unnest(fps) AS fp FROM w WHERE doc_id % 17 <> 0) t
           | WHERE fp IN (SELECT fp FROM e))
           |SELECT doc_id FROM w
           |WHERE doc_id % 17 <> 0 AND doc_id NOT IN (SELECT doc_id FROM c)""".stripMargin,

      "q86_minhash_verified" -> {
        val lanes = MinHashParams.zipWithIndex.map { case ((a, b), i) =>
          f"min((hp * $a + $b) %% 2147483647)::BIGINT AS mh$i%02d"
        }.mkString(",\n  ")
        s"""WITH d AS (SELECT doc_id, $norm AS nt FROM documents),
           |sh AS (
           | SELECT doc_id,
           |  unnest(list_distinct(list_transform(range(1, length(nt) - 3),
           |    i -> nt[i:i+4]))) AS s
           | FROM d WHERE length(nt) >= 5),
           |h AS (
           | SELECT doc_id,
           |  ('0x' || substr(md5(s), 1, 14))::BIGINT % 2147483647 AS hp
           | FROM sh)
           |SELECT doc_id, count(*)::BIGINT AS n_shingles,
           |  $lanes
           |FROM h GROUP BY doc_id""".stripMargin
      },

      "q75_simhash_verified" -> {
        val bitSums = (0 until 56).map(i =>
          s"sum(CASE WHEN (th >> $i) & 1 = 1 THEN 1 ELSE -1 END) AS b$i")
          .mkString(",\n  ")
        val compose = (0 until 56).map(i =>
          s"CASE WHEN b$i > 0 THEN ${1L << i} ELSE 0 END").mkString(" + ")
        s"""WITH toks AS (
           | SELECT doc_id, unnest(string_split($norm, ' ')) AS tok
           | FROM documents),
           |h AS (
           | SELECT doc_id,
           |  ('0x' || substr(md5(tok), 1, 14))::BIGINT AS th
           | FROM toks WHERE len(tok) > 0),
           |v AS (
           | SELECT doc_id, count(*)::BIGINT AS n_tokens,
           |  $bitSums
           | FROM h GROUP BY 1)
           |SELECT doc_id, n_tokens, ($compose)::BIGINT AS simhash56
           |FROM v""".stripMargin
      })
  }
}
