package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import scala.util.Random

/** Connected components: agreement with a driver-side union-find on
  * randomized graphs, worst-case chain convergence, isolated-pair shape. */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  private def unionFind(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    nodes.map(x => x -> find(x)).toMap
  }

  test("randomized: labels == union-find min-id components") {
    val rnd = new Random(7)
    for (trial <- 1 to 3) {
      val n = 60
      val edges = (1 to 80).map { _ =>
        val a = rnd.nextInt(n).toLong; val b = rnd.nextInt(n).toLong
        (math.min(a, b), math.max(a, b))
      }.filter(e => e._1 != e._2).distinct
      val got = Dedup.connectedComponents(edges.toDF("a", "b"), maxIter = 40)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = unionFind(n, edges)
      assert(got === want, s"trial $trial")
    }
  }

  test("worst-case chain converges to the single min label") {
    // 0-1-2-...-9: diameter 9, exercises the iteration bound of the
    // DISTRIBUTED loop (fast path disabled)
    val edges = (0L until 9L).map(i => (i, i + 1)).toDF("a", "b")
    val labels = Dedup.connectedComponents(edges, maxIter = 15,
      driverEdgeLimit = 0).collect()
    assert(labels.length === 10)
    assert(labels.forall(_.getLong(1) === 0L))
  }

  test("driver fast path == distributed loop on the same random graphs") {
    val rnd = new Random(23)
    for (trial <- 1 to 3) {
      val n = 40
      val edges = (1 to 60).map(_ =>
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }.toDF("a", "b")
      def asMap(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val fast = asMap(Dedup.connectedComponents(edges))
      val dist = asMap(Dedup.connectedComponents(edges, driverEdgeLimit = 0))
      assert(fast === dist, s"trial $trial")
    }
    // string ids take the lexicographic min root on the fast path too
    val sEdges = Seq(("img_b", "img_a"), ("img_c", "img_b")).toDF("a", "b")
    val labels = Dedup.connectedComponents(sEdges)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(labels === Map("img_a" -> "img_a", "img_b" -> "img_a", "img_c" -> "img_a"))
  }

  test("dropClusteredDuplicates keeps exactly one representative per component") {
    val docs = (0L to 9L).map(i => (i, s"doc$i")).toDF("doc_id", "text")
    // components {1,2,3} and {7,8}; 0,4,5,6,9 untouched
    val edges = Seq((1L, 2L), (2L, 3L), (7L, 8L)).toDF("a", "b")
    val kept = Dedup.dropClusteredDuplicates(docs, "doc_id", edges)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(kept.toSeq === Seq(0L, 1L, 4L, 5L, 6L, 7L, 9L))
  }

  test("perceptualEdges: exact copies and 1-byte near-dups edge; others don't") {
    import graft.functions.ImageCodec
    def img(seed: Long): Array[Byte] = ImageCodec.encode(seed, 16, 16, lossy = false)
    def nudge(b: Array[Byte]): Array[Byte] = {
      val c = b.clone(); c(8) = 0xff.toByte; c } // pixel (0,0) -> 255
    val rows = Seq(
      ("a1", img(1L)), ("a2", img(1L)),          // exact copy pair
      ("b1", img(2L)), ("b2", nudge(img(2L))),   // near-dup pair
      ("c1", img(3L))                            // singleton
    ).toDF("image_id", "bytes")
    val edges = Dedup.perceptualEdges(rows, "image_id", "bytes", maxHamming = 3)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(edges.contains(("a1", "a2")))
    assert(edges.contains(("b1", "b2")))
    // brute-force reference: the banded path must find EXACTLY the pairs
    // at hamming <= 3 (pigeonhole recall + exact verify = no more, no less)
    val hs = Seq("a1" -> img(1L), "a2" -> img(1L), "b1" -> img(2L),
      "b2" -> nudge(img(2L)), "c1" -> img(3L))
      .map { case (id, b) => id -> ImageCodec.aHash64(b) }
    val want = (for {
      (i, hi) <- hs; (j, hj) <- hs if i < j
      if java.lang.Long.bitCount(hi ^ hj) <= 3
    } yield (i, j)).toSet
    assert(edges === want)
  }

  test("disjoint pairs keep distinct reps") {
    val edges = Seq((1L, 2L), (10L, 11L), (20L, 21L)).toDF("a", "b")
    val got = Dedup.connectedComponents(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L))
  }
}
