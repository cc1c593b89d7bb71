package graft.graphx

import graft.SharedSpark
import org.scalatest.funsuite.AnyFunSuite

class AnalyticsSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  // a triangle a-b-c plus a pendant d and an isolated pair e-f
  private lazy val edges = Seq(
    ("a", "b"), ("b", "c"), ("a", "c"), ("c", "d"), ("e", "f"))
    .toDF("src", "dst")

  test("degrees") {
    val d = Analytics.degrees(spark, edges)
      .as[(String, Int, Int)].collect().map(t => t._1 -> ((t._2, t._3))).toMap
    assert(d("a") == ((0, 2)) && d("c") == ((2, 1)) && d("f") == ((1, 0)))
  }

  test("connected components sized and named by min uri") {
    val cc = Analytics.connectedComponents(spark, edges)
      .as[(String, Long)].collect().toSet
    assert(cc == Set(("a", 4L), ("e", 2L)))
  }

  test("triangle count") {
    assert(Analytics.triangleTotal(spark, edges).as[Long].head() == 1L)
  }

  test("shortest hops from a source set, undirected") {
    val sources = Seq("a").toDF("uri")
    val d = Analytics.shortestHops(spark, edges, sources)
      .as[(String, Int)].collect().toMap
    assert(d == Map("a" -> 0, "b" -> 1, "c" -> 1, "d" -> 2))
  }

  test("pagerank ranks the triangle above the pendant") {
    val pr = Analytics.pageRank(spark, edges, 10).as[(String, Double)].collect().toMap
    assert(pr("c") > pr("b"))
  }

  test("k-core peels pendants and cascades, bounded by rounds") {
    // triangle a-b-c with pendant tail c-d
    val tri = Seq(("a", "b"), ("b", "c"), ("c", "a"), ("c", "d"))
      .toDF("src", "dst")
    def core(k: Int, rounds: Int) =
      Analytics.kCore(tri, k, rounds).as[String].collect().toSet
    assert(core(2, 3) == Set("a", "b", "c")) // pendant d peels, triangle stays
    assert(core(3, 3).isEmpty)               // no 3-core in a triangle
    // chain: the peel cascades one layer per round
    val chain = Seq(("a", "b"), ("b", "c"), ("c", "d")).toDF("src", "dst")
    def chainCore(rounds: Int) =
      Analytics.kCore(chain, 2, rounds).as[String].collect().toSet
    assert(chainCore(1) == Set("b", "c")) // ends gone after one round
    assert(chainCore(2).isEmpty)          // the rest follows next round
  }

  test("releaseCaches unpersists every RDD a graph query cached") {
    Analytics.releaseCaches() // drop whatever earlier tests left
    val before = spark.sparkContext.getPersistentRDDs.keySet
    Analytics.connectedComponents(spark, edges).collect()
    Analytics.pageRank(spark, edges, 3).collect()
    assert(spark.sparkContext.getPersistentRDDs.keySet.size > before.size)
    Analytics.releaseCaches()
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    val detail = leaked.map(id =>
      s"$id:${spark.sparkContext.getPersistentRDDs(id)}")
    assert(leaked.isEmpty, s"leaked RDDs: $detail")
  }
}
