package graft

import graft.textops.{Ivf, PortableHash, Similarity}
import org.scalatest.funsuite.AnyFunSuite

/** Semantics of SemDeDup (cluster + within-cluster cosine + centroid-
  * distance keeper) against a plain-Scala brute force over the SAME
  * trained codebook (training itself is pinned by SimilaritySpec and the
  * ivf oracle); the DuckDB oracle is the value gate.
  */
class SemDedupSpec extends AnyFunSuite with SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  /** Planted corpus replicated in plain Scala (the Similarity
    * perturbation contract: every PlantEvery-th vector re-appears with
    * components scaled by 1 + (h%101-50)/1000).
    */
  private lazy val corpus: Map[Long, Array[Double]] = {
    import org.apache.spark.sql.functions._
    val base = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
      .collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getSeq[Double](1).toArray).toMap
    val planted = base.collect {
      case (id, v) if id % Similarity.PlantEvery == 0 =>
        (id + Similarity.PlantIdOffset) -> v.zipWithIndex.map { case (x, i) =>
          x * (1.0 + (PortableHash.hexint32(s"pert-$id-$i") % 101 - 50) / 1000.0)
        }
    }
    base ++ planted
  }

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def cos(a: Array[Double], b: Array[Double]): Double = {
    var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
    round6(d / (math.sqrt(na) * math.sqrt(nb)))
  }

  /** Brute-force twins of the cluster assignment and the SemDeDup dropped
    * set, shared by the dedup and D4-diversity tests.
    */
  private lazy val assign: Map[Long, (Int, Double)] = {
    val cb = Ivf.trainedCentroids(spark, sf)
    corpus.map { case (id, v) =>
      val cid = Ivf.nearestLists(cb, v, 1).head
      id -> (cid, Ivf.distSq(v, cb(cid)))
    }
  }
  private lazy val byCluster: Map[Int, Iterable[Long]] =
    corpus.keys.groupBy(id => assign(id)._1)
  private lazy val expectedDrop: Set[Long] = corpus.keys.filter { x =>
    val (cx, dx) = assign(x)
    byCluster(cx).exists { y =>
      y != x && {
        val dy = assign(y)._2
        (dy > dx || (dy == dx && y < x)) &&
          cos(corpus(x), corpus(y)) >= Ivf.SemDedupCosine
      }
    }
  }.toSet

  test("dedup_semantic matches the brute-force cluster + keeper rule") {

    val rows = Ivf.semDedup(spark, sf).collect()
    assert(rows.length === corpus.size)
    rows.foreach { r =>
      val id = r.getAs[Long]("vec_id")
      assert(r.getAs[Int]("cluster_id") === assign(id)._1, s"vec $id")
      assert(r.getAs[Boolean]("is_dup") === expectedDrop(id), s"vec $id")
      assert(r.getAs[Boolean]("keep") === !expectedDrop(id), s"vec $id")
    }
    assert(expectedDrop.nonEmpty, "planted duplicates must be detected")
    assert(expectedDrop.size < corpus.size)
  }

  test("every near-dup group keeps at least one member; planted pairs resolve") {
    val rows = Ivf.semDedup(spark, sf).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        (r.getAs[Int]("cluster_id"), r.getAs[Boolean]("is_dup"))).toMap
    // for each planted pair landing in one cluster, exactly the
    // centroid-NEARER copy is dropped (the farther one survives)
    var resolved = 0
    corpus.keys.filter(_ >= Similarity.PlantIdOffset).foreach { pid =>
      val src = pid - Similarity.PlantIdOffset
      if (rows(pid)._1 == rows(src)._1 &&
        cos(corpus(pid), corpus(src)) >= Ivf.SemDedupCosine) {
        assert(rows(pid)._2 || rows(src)._2, s"pair ($src, $pid): one must drop")
        // both dropping would need a third near-identical neighbor; the
        // plant is pairwise, so exactly one copy survives
        assert(!(rows(pid)._2 && rows(src)._2), s"pair ($src, $pid): both dropped")
        resolved += 1
      }
    }
    assert(resolved > 0, "some planted pair must land in one cluster")
  }

  test("embed_diversity keeps exactly the survivors ranked past floor(n*ProtoFrac)") {
    val survByCluster = corpus.keys.filterNot(expectedDrop).groupBy(id => assign(id)._1)
    val expected: Map[Long, (Long, Long, Boolean)] = survByCluster.flatMap {
      case (_, ids) =>
        val sorted = ids.toSeq.sortBy(id => (assign(id)._2, id))
        val n = sorted.size.toLong
        val cut = math.floor(n * Ivf.ProtoFrac).toLong
        sorted.zipWithIndex.map { case (id, i) =>
          id -> ((i + 1).toLong, n, (i + 1).toLong > cut)
        }
    }
    val rows = Ivf.d4Diversity(spark, sf).collect()
    assert(rows.length === expected.size)
    rows.foreach { r =>
      val id = r.getAs[Long]("vec_id")
      val (rank, n, keep) = expected(id)
      assert(r.getAs[Int]("cluster_id") === assign(id)._1, s"vec $id")
      assert(r.getAs[Long]("proto_rank") === rank, s"vec $id")
      assert(r.getAs[Long]("n_surv") === n, s"vec $id")
      assert(r.getAs[Boolean]("keep") === keep, s"vec $id")
    }
    // the prune is real (some prototype dropped) but never empties a
    // cluster — checked against the SPARK rows, not the reference map
    // (floor(n*ProtoFrac) <= n-1 makes the reference trivially non-empty)
    assert(rows.exists(r => !r.getAs[Boolean]("keep")), "some prototype must be pruned")
    val keptClusters = rows.filter(_.getAs[Boolean]("keep"))
      .map(_.getAs[Int]("cluster_id")).toSet
    survByCluster.keys.foreach { cid =>
      assert(keptClusters(cid), s"cluster $cid emptied")
    }
  }
}
