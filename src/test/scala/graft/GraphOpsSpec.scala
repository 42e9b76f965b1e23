package graft

import org.apache.spark.sql.functions._

import graft.ops.GraphOps

class GraphOpsSpec extends SparkSuite {
  import spark.implicits._

  /** Driver-side union-find ground truth. */
  private def unionFind(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = Array.tabulate(n.toLong.toInt)(i => i)
    def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a.toInt), find(b.toInt))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // path-compress to the min root
    (0 until n).map(i => i.toLong -> find(i).toLong).toMap
  }

  private def ccMap(edges: Seq[(Long, Long)], distributed: Boolean = false): Map[Long, Long] =
    GraphOps.connectedComponents(edges.toDF("src", "dst"), "src", "dst",
        driverMaxEdges = if (distributed) 0L else 1L << 19)
      .as[(Long, Long)].collect().toMap

  for (distributed <- Seq(false, true)) {
    val tier = if (distributed) "distributed loop" else "driver union-find"

    test(s"random graph matches union-find ground truth [$tier]") {
      val rnd = new scala.util.Random(42)
      val n = 300
      val edges = Seq.fill(250)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      val truth = unionFind(n, edges)
      val got = ccMap(edges, distributed)
      val touched = edges.flatMap(e => Seq(e._1, e._2)).toSet
      assert(got.keySet == touched, "one row per node appearing in edges")
      got.foreach { case (node, comp) =>
        assert(comp == truth(node.toInt), s"node $node: got $comp want ${truth(node.toInt)}")
      }
    }

    test(s"single long chain converges (diameter >> rounds) to min id [$tier]") {
      val n = 500L
      val edges = (0L until n - 1).map(i => (i, i + 1))
      val got = ccMap(edges, distributed)
      assert(got.size == n && got.values.forall(_ == 0L))
    }
  }

  test("duplicate, reversed, and self-loop edges are tolerated") {
    val edges = Seq((1L, 2L), (2L, 1L), (1L, 2L), (3L, 3L), (4L, 5L))
    val got = ccMap(edges)
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 4L, 5L -> 4L))
  }

  test("disjoint cliques keep separate min labels") {
    val cliqueA = for (a <- 0L to 3L; b <- (a + 1) to 3L) yield (a, b)
    val cliqueB = for (a <- 10L to 13L; b <- (a + 1) to 13L) yield (a, b)
    val got = ccMap(cliqueA ++ cliqueB)
    assert((0L to 3L).forall(got(_) == 0L) && (10L to 13L).forall(got(_) == 10L))
  }

  test("dropNearDuplicates keeps one representative per cluster plus untouched rows") {
    val rows = (0L to 9L).map(i => (i, s"doc$i")).toDF("doc_id", "payload")
    // clusters {0,1,2} (via chain 0-1-2) and {5,7}; 3,4,6,8,9 untouched
    val pairs = Seq((0L, 1L), (1L, 2L), (5L, 7L)).toDF("id_a", "id_b")
    val kept = GraphOps.dropNearDuplicates(rows, "doc_id", pairs, "id_a", "id_b")
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(0L, 3L, 4L, 5L, 6L, 8L, 9L))
  }

  test("dedupClusters composes with a real near-dup pair op") {
    val docs = Tables.documents(spark, sf)
    val pairs = graft.ops.DedupOps.jaccardPairsGlobal(docs, "doc_id", "text", 3, 0.6)
    val clusters = GraphOps.dedupClusters(pairs, "id_a", "id_b")
    // every cluster id is a member of its own cluster, and is the minimum
    val byCluster = clusters.groupBy("cluster_id")
      .agg(min("id").as("mn"), count(lit(1)).as("n"))
    assert(byCluster.filter($"mn" =!= $"cluster_id").count() == 0)
    assert(byCluster.filter($"n" < 2).count() == 0,
      "pair graph nodes always cluster with at least their pair partner")
  }
}
