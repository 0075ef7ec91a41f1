package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Near-duplicate CLUSTER formation — the step after pairwise candidates:
  * a training-data pipeline dedups by keeping one representative per
  * connected component of the verified near-dup graph, not per pair
  * (pairs alone double-drop A–B, B–C chains).
  *
  * [[connectedComponents]] is min-label propagation over the edge list:
  * every node starts labeled with its own id; each round takes the min of
  * its neighbors' labels; at fixpoint every node carries the min id of its
  * component (the canonical representative). Rounds needed = graph
  * diameter — near-dup components are shallow (a hub original with its
  * copies, diameter ≤ 2–3), so the loop converges in a handful of rounds;
  * `maxIter` bounds adversarial chains.
  *
  * Scale shape: each round is ONE join edges⋈labels + ONE min-aggregate —
  * both hash-partitioned on node id, no windows, no collects (the only
  * driver-side value is the converged-yet check, the standard iterative
  * fixpoint test). Each round's labels are `localCheckpoint`ed: persist
  * alone caches EXECUTION but the logical plan still compounds (the round-N
  * plan embeds round-N−1 twice, so analysis blows up exponentially — the
  * classic iterative-join OOM); checkpointing truncates the lineage to the
  * materialized blocks, keeping every round's plan one join deep.
  */
object Dedup {

  /** @param edges undirected edge list (columns `a`, `b`, one row per pair)
    * @param driverEdgeLimit near-dup graphs are usually tiny relative to
    *        the corpus (pairs, not rows) — when the edge list fits under
    *        this bound it is collected once and union-find runs on the
    *        driver in O(E α), skipping the iterative join loop whose
    *        ~0.5 s/round fixed cost (join + localCheckpoint) dominates on
    *        small graphs. Above the bound the distributed min-label loop
    *        runs unchanged. 0 disables the fast path.
    * @return (id, cluster_rep) — every node that appears in an edge, labeled
    *         with the min id reachable from it. */
  def connectedComponents(edges: DataFrame, maxIter: Int = 20,
                          driverEdgeLimit: Int = 100000): DataFrame = {
    // persist before the probe: edge lists come from expensive candidate
    // joins, and when the graph exceeds the limit the distributed loop
    // below would otherwise recompute that join from scratch (twice, via
    // the symmetrize union)
    val edgeList = edges.select(col("a"), col("b"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // fast path only for id types whose driver-side ordering provably
    // matches Spark's min(): binary compares by reference (would split
    // duplicate endpoints), and timestamp/date/interval ids would fall to
    // a lossy String.valueOf order that can disagree with min() — those
    // take the distributed loop, whose min() IS the ordering
    val fastEligible = driverEdgeLimit > 0 && {
      import org.apache.spark.sql.types._
      edges.schema("a").dataType match {
        case ByteType | ShortType | IntegerType | LongType => true
        case StringType => true
        case FloatType | DoubleType => true
        case _: DecimalType => true
        case _ => false
      }
    }
    if (fastEligible) {
      // one action either way: collect limit+1 rows; a short result IS the
      // whole edge list, otherwise fall through to the distributed loop
      val sample = edgeList.limit(driverEdgeLimit + 1).collect()
      if (sample.length <= driverEdgeLimit) {
        val parent = scala.collection.mutable.HashMap.empty[Any, Any]
        def find(x0: Any): Any = {
          var x = x0
          while (parent(x) != x) {
            parent(x) = parent(parent(x)); x = parent(x)
          }
          x
        }
        // string order must be UTF-8 BINARY (Spark's UTF8String min and
        // the DuckDB oracles compare bytes) — Scala's String < is UTF-16
        // code-unit order, which disagrees above the BMP
        def utf8Lt(a: String, b: String): Boolean = {
          val (xa, xb) = (a.getBytes("UTF-8"), b.getBytes("UTF-8"))
          var i = 0
          val n = math.min(xa.length, xb.length)
          while (i < n) {
            val c = (xa(i) & 0xff) - (xb(i) & 0xff)
            if (c != 0) return c < 0
            i += 1
          }
          xa.length < xb.length
        }
        def lt(x: Any, y: Any): Boolean = (x, y) match {
          case (a: Long, b: Long) => a < b
          case (a: Int, b: Int) => a < b
          case (a: String, b: String) => utf8Lt(a, b)
          case (a: java.math.BigDecimal, b: java.math.BigDecimal) =>
            a.compareTo(b) < 0 // exact — doubleValue collides past 53 bits
          case (a: java.lang.Number, b: java.lang.Number) =>
            a.doubleValue < b.doubleValue
          case _ => throw new IllegalStateException(
            s"unorderable id type in CC fast path: ${x.getClass} (gate bug)")
        }
        sample.foreach { r =>
          val (a, b) = (r.get(0), r.get(1))
          parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) {
            if (lt(ra, rb)) parent(rb) = ra else parent(ra) = rb
          }
        }
        val spark = edges.sparkSession
        val idType = edges.schema("a").dataType
        val schema = org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("id", idType),
          org.apache.spark.sql.types.StructField("cluster_rep", idType)))
        val rows = parent.keys.toSeq.map(k =>
          org.apache.spark.sql.Row(k, find(k)))
        edgeList.unpersist(blocking = false)
        return spark.createDataFrame(
          java.util.Arrays.asList(rows: _*), schema)
      }
    }
    // symmetrize once: propagation below only follows a -> b
    val sym = edgeList
      .unionByName(edgeList.select(col("b").as("a"), col("a").as("b")))
      .persist(StorageLevel.MEMORY_AND_DISK)

    var labels = sym.select(col("a").as("id")).distinct()
      .withColumn("lbl", col("id"))
      .localCheckpoint(true)

    var it = 0
    var converged = false
    while (!converged && it < maxIter) {
      // min incoming neighbor label per node
      val nbr = sym.join(labels, sym("a") === labels("id"))
        .groupBy(sym("b").as("nid")).agg(min(col("lbl")).as("nlbl"))
      val next = labels.join(nbr, labels("id") === nbr("nid"), "left")
        .select(col("id"),
          least(col("lbl"), coalesce(col("nlbl"), col("lbl"))).as("lbl"),
          (col("nlbl") < col("lbl")).as("__improved"))
        .localCheckpoint(true) // truncate lineage: one round deep, always
      converged = next.where(col("__improved")).isEmpty
      labels = next.drop("__improved")
      it += 1
    }
    sym.unpersist(blocking = false)
    edgeList.unpersist(blocking = false)
    labels.select(col("id"), col("lbl").as("cluster_rep"))
  }

  /** Benchmark decontamination: drop every candidate row that shares at
    * least one fingerprint with the eval set — fingerprints are whatever
    * the caller computed (token n-gram shingles for the C4/GPT-3-style
    * overlap rule; `Text.winnowFingerprints` for char-run matching). The eval
    * fingerprint set is distinct-ed and BROADCAST — it is benchmark-sized,
    * not corpus-sized — so the probe under the explode is a broadcast join
    * followed by one id-distinct + one left-anti, and the corpus is never
    * shuffled by fingerprint.
    *
    * @param evalFps one fingerprint per row, column `fp` */
  def decontaminate(candidates: DataFrame, idCol: String, fpsCol: String,
                    evalFps: DataFrame): DataFrame = {
    // no distinct on the probe side: left_anti dedups the right side
    // implicitly, so de-duplicating contaminated ids first would only add
    // a shuffle of the same rows. explode_OUTER, not explode: a plain
    // explode makes InferFiltersFromGenerate add `size(fps) > 0` on the
    // fps attribute, and PushDownPredicates then pushes that filter through
    // the projections SUBSTITUTING the alias chain — re-fusing whatever
    // expression built fps into a per-row predicate (for winnowing
    // fingerprints that re-fusion is O(len²) per row — measured 1000×).
    // The outer generate infers nothing; its null rows never match the
    // equi-join key, so semantics are identical.
    val contaminated = candidates
      .select(col(idCol), explode_outer(col(fpsCol)).as("__fp"))
      .join(broadcast(evalFps.select(col("fp").as("__fp")).distinct()), Seq("__fp"))
      .select(idCol)
    candidates.join(contaminated, Seq(idCol), "left_anti")
  }

  /** The dedup step itself: drop every clustered row EXCEPT its component's
    * representative (the min id). Rows not in any edge are untouched. One
    * left-anti join against the non-representative id set — hash-partitioned
    * on the id, no windows. */
  def dropClusteredDuplicates(df: DataFrame, idCol: String, edges: DataFrame,
                              maxIter: Int = 20): DataFrame = {
    val nonReps = connectedComponents(edges, maxIter)
      .where(col("id") =!= col("cluster_rep"))
      .select(col("id").as(idCol))
    df.join(nonReps, Seq(idCol), "left_anti")
  }

  /** Near-dup IMAGE edge list by perceptual hash — the payload-side
    * candidate stage (the image analog of the MinHash band join): aHash64
    * over the bytes column (codegen'd Catalyst expression), 4 x 16-bit
    * band LSH self-join, exact `bit_count(xor)` hamming verify. Pigeonhole
    * gives the banding 100% candidate recall for `maxHamming` <= 3 (a pair
    * differing in <= 3 bits cannot differ in all 4 bands), so the edge set
    * is deterministic, not probabilistic. `cap` salt-splits degenerate
    * buckets (monochrome/boilerplate images all sharing a band) so the
    * self-join never goes quadratic on them; within an over-cap bucket
    * recall degrades gracefully (documented sampling, as saltBuckets).
    *
    * Feed the result to [[connectedComponents]] /
    * [[dropClusteredDuplicates]] — `Main --dedup <h>` wires exactly that
    * chain in front of the feature pipeline. */
  def perceptualEdges(df: DataFrame, idCol: String, bytesCol: String,
                      maxHamming: Int = 1, cap: Int = 4096): DataFrame =
    perceptualEdgesFromHashes(
      df.select(col(idCol).as("__id"),
        graft.functions.ImageFunctions.ahash64(col(bytesCol)).as("__ah")),
      "__id", "__ah", maxHamming, cap)
      .select(col("a"), col("b"))

  /** The band-LSH pair stage over a precomputed (id, hash) frame — the
    * single implementation behind [[perceptualEdges]] and the oracled
    * q91/q95/q102 queries, so the pigeonhole-recall formula exists once.
    * Emits (a, b, hamming) with the EXACT hamming distance.
    *
    * @param bandBits band width; 4 bands of `bandBits` cover hashes of
    *        4*bandBits significant bits — a SHORTER hash under the default
    *        16-bit bands would leave a top band identically zero (one
    *        degenerate all-corpus bucket whose salt-split loses recall),
    *        so size the bands to the hash (8 for the 32-bit audio RMS
    *        fingerprint — see q102 — 16 for aHash64). */
  def perceptualEdgesFromHashes(hashed: DataFrame, idCol: String, hashCol: String,
                                maxHamming: Int, cap: Int = 4096,
                                broadcastSizes: Boolean = false,
                                bandBits: Int = 16): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3,
      "4-band LSH guarantees recall only for maxHamming <= 3")
    val salted = bandAndSalt(
      hashed.select(col(idCol).as("__id"), col(hashCol).as("__ah")),
      cap, broadcastSizes, bandBits)
    val a = salted.select(col("__bucket"), col("__salt"),
      col("__id").as("a"), col("__ah").as("__ha"))
    val b = salted.select(col("__bucket"), col("__salt"),
      col("__id").as("b"), col("__ah").as("__hb"))
    a.join(b, Seq("__bucket", "__salt"))
      .where(col("a") < col("b"))
      .select(col("a"), col("b"),
        bit_count(col("__ha").bitwiseXOR(col("__hb"))).as("hamming"))
      .where(col("hamming") <= maxHamming)
      .distinct()
  }

  /** INCREMENTAL near-dup edge discovery — the 100 TB ingest loop's hot
    * stage: given the persisted signature state (everything hashed so far)
    * and a freshly arrived batch's signatures, emit exactly the edges of
    * the full graph that TOUCH the batch (batch–batch and batch–state
    * pairs). State–state pairs were emitted when THEIR batches arrived, so
    * the union of every batch's output equals
    * [[perceptualEdgesFromHashes]] over the accumulated corpus — proved
    * pairwise-equal in IncrementalDedupSpec and end-to-end by the oracled
    * q119 (batch-incremental labels == DuckDB's full-corpus closure).
    *
    * Cost shape: only the BATCH is hashed upstream; this join shuffles the
    * (id, hash) signature table — tens of bytes per corpus row, not the
    * payload — keyed on band bucket, and the probe side is batch-sized. A
    * deployment that bands the persisted state once into a bucketed layout
    * ([[graft.sources.SnapshotTable.commitBucketed]] on `__bucket`) makes
    * even that shuffle one-sided.
    *
    * Salting caveat: the over-`cap` salt split is keyed on the COMBINED
    * (state + batch) bucket histogram, which grows as the corpus does —
    * within-bucket sampling for a degenerate bucket is therefore taken at
    * each batch's own corpus size, a different (still recall-degrading,
    * still documented) sample than one full-corpus run would take. Below
    * `cap` the two are exactly equal; q119 runs in that regime. */
  def incrementalEdgesFromHashes(state: DataFrame, fresh: DataFrame,
                                 idCol: String, hashCol: String,
                                 maxHamming: Int, cap: Int = 4096,
                                 broadcastSizes: Boolean = false,
                                 bandBits: Int = 16): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3,
      "4-band LSH guarantees recall only for maxHamming <= 3")
    val combined = state
      .select(col(idCol).as("__id"), col(hashCol).as("__ah"),
        lit(false).as("__new"))
      .unionByName(fresh.select(col(idCol).as("__id"),
        col(hashCol).as("__ah"), lit(true).as("__new")))
    val salted = bandAndSalt(combined, cap, broadcastSizes, bandBits)
    val a = salted.select(col("__bucket"), col("__salt"),
      col("__id").as("__ida"), col("__ah").as("__ha"))
    val b = salted.where(col("__new")).select(col("__bucket"), col("__salt"),
      col("__id").as("__idb"), col("__ah").as("__hb"))
    // asymmetric: every candidate has a batch endpoint, so state–state
    // pairs are never re-generated; a batch–batch pair arrives in both
    // orientations and collapses under the canonical (least, greatest)
    a.join(b, Seq("__bucket", "__salt"))
      .where(col("__ida") =!= col("__idb"))
      .select(least(col("__ida"), col("__idb")).as("a"),
        greatest(col("__ida"), col("__idb")).as("b"),
        bit_count(col("__ha").bitwiseXOR(col("__hb"))).as("hamming"))
      .where(col("hamming") <= maxHamming)
      .distinct()
  }

  /** The shared LSH candidate stage: 4 `bandBits`-wide bands exploded per
    * row (band index folded into the bucket id so bands never collide),
    * then the over-`cap` salt split. Extra input columns ride through. */
  private def bandAndSalt(idHash: DataFrame, cap: Int,
                          broadcastSizes: Boolean, bandBits: Int): DataFrame = {
    require(bandBits > 0 && bandBits <= 16, "bandBits in 1..16")
    val mask = (1L << bandBits) - 1
    val banded = idHash.withColumn("__bucket",
      explode(array((0 until 4).map(i =>
        lit(i.toLong * (mask + 1)) +
          shiftright(col("__ah"), bandBits * i).bitwiseAND(lit(mask))): _*)))
    graft.functions.Vectors.saltBuckets(banded, "__bucket", "__id",
      cap = cap, broadcastSizes = broadcastSizes)
  }
}
