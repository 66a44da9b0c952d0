package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.jobs.EmbeddingQueries
import graft.operators.Dedup

/** [[Dedup.embeddingNearDup]] — the embedding-cosine member of the
  * dedup family: planted-copy recall, value exactness, and the
  * candidate bound that keeps it off the all-pairs path.
  */
class EmbedNearDupSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private lazy val emb = Tables.load(spark, sf0001, "embeddings").cache()
  private val tables = EmbeddingQueries.nearDupTables

  test("exact planted copies are always found with sim 1.0") {
    // exact copies collide in EVERY sign table by construction
    val copies = emb.limit(10).withColumn("vec_id", $"vec_id" + 100000L)
    val planted = emb.unionByName(copies)
    val pairs = Dedup.embeddingNearDup(planted, tables, threshold = 0.99)
      .collect()
    val found = pairs.map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = (0L until 10L).map(i => (i, i + 100000L)).toSet
    assert(expected.subsetOf(found),
      s"missed planted copies: ${expected.diff(found)}")
    assert(pairs.filter(r => expected(r.getLong(0) -> r.getLong(1)))
      .forall(_.getAs[Double]("sim") === 1.0))
  }

  test("scaled copies (same direction) are found: cosine is scale-invariant") {
    // 2x-scaled copy: identical sign pattern -> collides in every table
    val scaled = emb.limit(5)
      .withColumn("vec_id", $"vec_id" + 200000L)
      .withColumn("embedding", transform($"embedding", x => x * lit(2.0f)))
    val planted = emb.unionByName(scaled)
    val found = Dedup.embeddingNearDup(planted, tables, threshold = 0.99)
      .filter($"vec_b" >= 200000L)
      .select($"vec_a", $"vec_b").as[(Long, Long)].collect().toSet
    assert((0L until 5L).map(i => (i, i + 200000L)).toSet.subsetOf(found))
  }

  test("reported sims are exact: they match brute-force cosine on the same pairs") {
    val pairs = Dedup.embeddingNearDup(emb, tables, threshold = 0.3)
    // recompute each reported pair's cosine the brute-force way
    val brute = {
      import graft.functions.VectorOps._
      val n = emb.select($"vec_id", asDouble($"embedding").as("v"))
        .withColumn("nrm", l2Norm($"v"))
      val a = n.select($"vec_id".as("vec_a"), $"v".as("av"), $"nrm".as("an"))
      val b = n.select($"vec_id".as("vec_b"), $"v".as("bv"), $"nrm".as("bn"))
      a.join(b, $"vec_a" < $"vec_b")
        .withColumn("bsim", roundedSim(dot($"av", $"bv") / ($"an" * $"bn")))
        .select($"vec_a", $"vec_b", $"bsim")
    }
    val joined = pairs.join(brute, Seq("vec_a", "vec_b"), "left")
    assert(joined.filter($"bsim".isNull || $"sim" =!= $"bsim").count() === 0)
  }

  test("bucketCap bounds a planted hot sign-bucket's candidate fan") {
    // 100 vectors, positive in every coordinate → one hot bucket in
    // EVERY table (the post-normalization dominant-direction pathology).
    // Cap 10 → candidates only among the 10 lowest vec_ids: ≤ C(10,2)
    // pairs instead of C(100,2).
    val hot = spark.range(100).select(
      $"id".as("vec_id"),
      transform(sequence(lit(1), lit(64)),
        i => (i + $"id" % 5 + 1).cast("float")).as("embedding"))
    val pairs = Dedup.embeddingNearDup(hot, tables, threshold = 0.0,
      bucketCap = 10).collect()
    assert(pairs.length <= 45, s"cap leaked: ${pairs.length} pairs > C(10,2)")
    val ids = pairs.flatMap(r => Seq(r.getLong(0), r.getLong(1))).toSet
    assert(ids.subsetOf((0L until 10L).toSet),
      s"pair member past the cap: ${ids.filter(_ >= 10)}")
  }

  // ---------------------------------------------------------- semanticDedup

  /** q55's fixed-centroid geometry over an arbitrary corpus frame. */
  private def centroidsOf(corpus: org.apache.spark.sql.DataFrame) =
    corpus.filter($"vec_id" < 8)
      .select($"vec_id".cast("int").as("cell"),
        $"embedding".cast("array<double>").as("centroid"))

  test("semanticDedup: planted exact copies are dropped, originals kept") {
    val copies = emb.limit(3).withColumn("vec_id", $"vec_id" + 300000L)
    val planted = emb.unionByName(copies)
    val dropped = Dedup.semanticDedup(planted, centroidsOf(planted),
      eps = 0.99)
    val ids = dropped.select($"vec_id").as[Long].collect().toSet
    // an exact copy lands in its original's cell (identical distance
    // vector → identical tie-break) and pairs at sim 1.0 ≥ eps
    assert((0L until 3L).map(_ + 300000L).toSet.subsetOf(ids),
      s"planted copies not dropped: ${ids.filter(_ >= 300000L)}")
    // keep-first greedy: the originals (lower ids, no lower-id twin at
    // eps .99) must survive
    assert(ids.intersect((0L until 3L).toSet).isEmpty)
  }

  test("semanticDedup: pairs exist only within a cell, and clusterCap bounds the fan") {
    // clusterCap = 1 → every cell admits one member → no pairs at all
    assert(Dedup.semanticDedup(emb, centroidsOf(emb), eps = 0.0,
      clusterCap = 1).count() === 0)
    // eps = 0 (every within-cell pair is a "duplicate"): the drop side
    // with cap c admits ≤ c members per cell, of which all but the
    // first can be dropped — so drops per cell ≤ c − 1
    val dropped = Dedup.semanticDedup(emb, centroidsOf(emb), eps = 0.0,
      clusterCap = 5)
    val perCell = dropped.groupBy($"cell").count()
      .agg(max($"count")).head().getLong(0)
    assert(perCell <= 4, s"cap leaked: $perCell drops in one cell")
  }

  test("candidate verification never touches more than the colliding pairs") {
    // upper bound: sum over (table, bucket) of C(n,2) — the operator's
    // join fan; must be well under all-pairs C(N,2)
    val n = emb.count()
    val allPairs = n * (n - 1) / 2
    val corpus = emb.select($"vec_id",
      graft.functions.VectorOps.asDouble($"embedding").as("v"))
    val perBucket = corpus.select(
      $"vec_id",
      explode(array(tables.zipWithIndex.map { case (cs, t) =>
        struct(lit(t).as("t"),
          graft.functions.VectorOps.signBucket($"v", cs).as("bh"))
      }: _*)).as("bk"))
      .groupBy($"bk.t", $"bk.bh").count()
      .select(($"count" * ($"count" - 1) / 2).as("pairs"))
      .agg(sum($"pairs")).head().getDouble(0)
    assert(perBucket < allPairs / 3.0,
      s"bucketing did not shrink the pair space: $perBucket vs $allPairs")
  }
}
