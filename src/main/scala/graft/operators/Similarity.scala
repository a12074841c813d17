package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Vectors
import graft.util.CacheScope

/** Approximate/exact nearest-neighbor search over an embedding column
  * (`array<float>`), SURVEY.md §2.5 X15.
  *
  * Scale design: the query set is always the small side → broadcast it;
  * the candidate scan is embarrassingly parallel. Top-k selection is
  * TWO-PHASE so no single reducer ever sees the full candidate set:
  * phase 1 ranks within (query, input-partition) — parallel width =
  * #queries × #partitions; phase 2 ranks the surviving k × #partitions
  * rows per query. At 100 TB the phase-2 input is tiny.
  */
object Similarity {

  /** Per-row view of an embeddings table with a precomputed L2 norm.
    * The vector stays a RAW float array — [[Vectors.dot]] promotes per
    * element inside its codegen loop, so no float64 copy is ever
    * materialized or shuffled (half the bytes through every exchange). */
  def prepared(emb: DataFrame, idCol: String, vecCol: String): DataFrame =
    emb.select(col(idCol).as("vec_id"), col(vecCol).as("v"))
      .withColumn("nrm", Vectors.norm(col("v")))

  /** Brute-force cosine top-k for a fixed set of query ids. Cosines are
    * rounded to `roundDigits` BEFORE ranking (ties broken by vec_id
    * ascending) so the ranking is reproducible across engines. */
  def cosineTopK(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      queryIds: Seq[Int],
      k: Int,
      roundDigits: Int = 4): DataFrame = {
    val base = prepared(emb, idCol, vecCol)
    val q = base.filter(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id").as("q"), col("v").as("qv"), col("nrm").as("qn"))
    val scored = base.join(broadcast(q), col("vec_id") =!= col("q"))
      .withColumn("cos",
        round(Vectors.cosineWithNorms(col("qv"), col("v"), col("qn"), col("nrm")),
          roundDigits))
      .select(col("q"), col("vec_id"), col("cos"))
    twoPhaseTopK(scored, k)
  }

  /** Random-hyperplane sign bucket per row: bucket = Σ_j [dot(v, p_j)>0]·2^j
    * (planes = a fixed, deterministic subset of the corpus itself so both
    * engines derive identical planes). The bucket is aggregated keyed by
    * vec_id ALONE, then v/nrm joined back — grouping by the full vector
    * array would shuffle every embedding as a grouping key and compare
    * arrays for equality in the hash agg. */
  private def lshBucketed(base: DataFrame, planeIds: Seq[Int],
      scope: CacheScope): DataFrame =
    bucketedWithPlanes(base,
      base.filter(col("vec_id").isin(planeIds: _*))
        .select(col("vec_id").as("pid"), col("v").as("pv")),
      planeIds, scope)

  /** [[lshBucketed]] with the hyperplanes supplied by the caller — the
    * cross-side form needs BOTH sides bucketed under the reference's
    * planes, not each side's own. */
  private def bucketedWithPlanes(base: DataFrame, planes: DataFrame,
      planeIds: Seq[Int], scope: CacheScope): DataFrame = {
    val rankExpr = planeIds.zipWithIndex.foldLeft(lit(0)) { case (acc, (id, i)) =>
      acc + when(col("pid") === id, lit(1 << i)).otherwise(0)
    }
    bucketedWithBitPlanes(base, planes.withColumn("bit", rankExpr), scope)
  }

  /** Bucketing against a plane table that carries its own bit weights
    * (pid, pv, bit) — the stored-index probe path, where the weights
    * were frozen at index-build time. */
  private def bucketedWithBitPlanes(base: DataFrame, planes: DataFrame,
      scope: CacheScope): DataFrame = {
    val buckets = base.join(broadcast(planes))
      .withColumn("__b",
        when(Vectors.dot(col("v"), col("pv")) > 0d, col("bit")).otherwise(0))
      .groupBy(col("vec_id"))
      .agg(sum(col("__b")).cast("bigint").as("bucket"))
    // persisted: the bucketed view feeds the query-side filter AND the
    // candidate side of the bucket join — without it every branch
    // re-scans the embeddings and recomputes plane dots. The scope owns
    // the block's lifetime — callers unpersist after materializing.
    scope.persist(base.join(buckets, Seq("vec_id")))
  }

  /** LSH-bucketed ANN: candidates are restricted to the query's bucket
    * — the scan cost drops by ~2^numPlanes at the cost of recall.
    *
    * `probeRadius` = multi-probe: also search buckets within that
    * hamming distance of the query's bucket (radius 1 → 1 + numPlanes
    * buckets). Near misses across a single hyperplane are the dominant
    * recall loss, so radius 1 recovers most of it for a ×(planes+1)
    * candidate cost — still exponentially cheaper than a full scan. */
  def annLshTopK(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      queryIds: Seq[Int],
      planeIds: Seq[Int],
      k: Int,
      roundDigits: Int = 4,
      probeRadius: Int = 0,
      scope: CacheScope = CacheScope.unmanaged): DataFrame = {
    require(probeRadius <= 1, "probeRadius > 1 not supported (use more bands instead)")
    val bucketed = lshBucketed(prepared(emb, idCol, vecCol), planeIds, scope)
    val probes: Column =
      if (probeRadius == 0) array(col("bucket"))
      else array(col("bucket") +:
        planeIds.indices.map(i => col("bucket").bitwiseXOR(1L << i)): _*)
    val q = bucketed.filter(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id").as("q"), col("v").as("qv"), col("nrm").as("qn"),
        explode(probes).as("qbucket"))
    val scored = bucketed.join(broadcast(q),
        col("bucket") === col("qbucket") && col("vec_id") =!= col("q"))
      .withColumn("cos",
        round(Vectors.cosineWithNorms(col("qv"), col("v"), col("qn"), col("nrm")),
          roundDigits))
      .select(col("q"), col("vec_id"), col("cos"))
    twoPhaseTopK(scored, k)
  }

  /** LSH-bucketed embedding near-dup pairs — the 100 TB path for
    * [[cosineNearDupPairs]]: exact cosine is verified only WITHIN a
    * bucket, so the join fans out per bucket (E[pairs] ≈ n²/2^planes for
    * balanced buckets) instead of all-pairs. Recall is bounded by the
    * usual hyperplane-LSH collision probability (1 − θ/π)^planes for
    * angle θ — near-dups (θ→0) collide with high probability. */
  def cosineNearDupPairsLsh(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      planeIds: Seq[Int],
      threshold: Double,
      roundDigits: Int = 4,
      scope: CacheScope = CacheScope.unmanaged): DataFrame = {
    val bucketed = lshBucketed(prepared(emb, idCol, vecCol), planeIds, scope)
    val right = bucketed.select(col("bucket"),
      col("vec_id").as("b_id"), col("v").as("bv"), col("nrm").as("bn"))
    bucketed.join(right, Seq("bucket")).where(col("vec_id") < col("b_id"))
      .withColumn("cos",
        round(Vectors.cosineWithNorms(col("v"), col("bv"), col("nrm"), col("bn")),
          roundDigits))
      .filter(col("cos") >= threshold)
      .select(col("vec_id").as("a"), col("b_id").as("b"), col("cos"))
  }

  /** Cross-side-only embedding near-dup pairs: new batch vs frozen
    * reference — the embedding twin of the lexical
    * [[Dedup.minhashNearDupsAgainstReference]], and the probe primitive
    * of a streaming SemDeDup layer: a paraphrased or re-rendered
    * recrawl that slips past byte and shingle dedup still lands next to
    * its original in embedding space. Both sides bucket under the SAME
    * hyperplanes, drawn from the reference (frozen by contract, so the
    * planes are stable across batches); candidates come ONLY from
    * cross-side bucket collisions — batch-internal and
    * reference-internal pairs are never generated — and exact cosine
    * verifies candidates only. Output rows are (a = batch id,
    * b = reference id, cos); the two sides keep separate id spaces.
    * Per batch: one plane-dot pass over each side, one bucket join
    * ∝ collisions — the reference is never compared all-pairs. */
  def embeddingNearDupsAgainstReference(
      batch: DataFrame,
      reference: DataFrame,
      idCol: String,
      vecCol: String,
      planeIds: Seq[Int],
      threshold: Double,
      roundDigits: Int = 4,
      scope: CacheScope = CacheScope.unmanaged): DataFrame = {
    val refBase = prepared(reference, idCol, vecCol)
    val planes = refBase.filter(col("vec_id").isin(planeIds: _*))
      .select(col("vec_id").as("pid"), col("v").as("pv"))
    val refB = bucketedWithPlanes(refBase, planes, planeIds, scope)
      .select(col("bucket"), col("vec_id").as("b_id"),
        col("v").as("bv"), col("nrm").as("bn"))
    val batB = bucketedWithPlanes(prepared(batch, idCol, vecCol),
      planes, planeIds, scope)
    batB.join(refB, Seq("bucket"))
      .withColumn("cos",
        round(Vectors.cosineWithNorms(col("v"), col("bv"), col("nrm"), col("bn")),
          roundDigits))
      .filter(col("cos") >= threshold)
      .select(col("vec_id").as("a"), col("b_id").as("b"), col("cos"))
  }

  /** Drop form of [[embeddingNearDupsAgainstReference]]: the batch with
    * every row that embedding-matches the reference removed — the
    * semantic-dedup gate a curation stream composes after the exact and
    * shingle layers. */
  def dropEmbeddingNearDupsAgainstReference(
      batch: DataFrame,
      reference: DataFrame,
      idCol: String,
      vecCol: String,
      planeIds: Seq[Int],
      threshold: Double,
      roundDigits: Int = 4,
      scope: CacheScope = CacheScope.unmanaged): DataFrame = {
    val dupIds = embeddingNearDupsAgainstReference(batch, reference, idCol,
        vecCol, planeIds, threshold, roundDigits, scope)
      .select(col("a").as(idCol)).distinct()
    batch.join(dupIds, Seq(idCol), "left_anti")
  }

  /** A persisted embedding near-dup index: the reference's hyperplanes
    * (with their frozen bit weights) and its bucketed vectors, both
    * read back from parquet. */
  case class EmbeddingIndex(planes: DataFrame, buckets: DataFrame)

  /** One-time persisted embedding index over a frozen reference — the
    * vector twin of [[Dedup.ensureReferenceDigests]] (exact layer) and
    * [[Dedup.ensurePersistedIndex]] (shingle layer), closing the same
    * scale hole for the semantic layer:
    * [[embeddingNearDupsAgainstReference]] re-buckets the ENTIRE
    * reference on every call — one plane-dot pass over all reference
    * vectors per batch, the O(batches × reference) trap. This hoists
    * the bucketing into a stored (bucket, b_id, bv, bn) parquet plus a
    * (pid, pv, bit) plane table; the healthy per-batch path is a stamp
    * read + memoized parquet opens — the reference's vectors are never
    * re-read. Staleness uses [[Dedup.corpusIdentity]] (file metadata +
    * canonicalized plan for file-backed frames, content hash
    * otherwise) extended with the plane ids and columns; parquet is
    * written BEFORE the stamp, so a crash mid-build leaves "no stamp →
    * rebuild", never a stamp vouching for a partial index. */
  def ensureEmbeddingIndex(reference: DataFrame, idCol: String, vecCol: String,
      planeIds: Seq[Int], indexDir: String): EmbeddingIndex = {
    val spark = reference.sparkSession
    val (mode, cnt, fp) = Dedup.corpusIdentity(reference, idCol, vecCol)
    val ident = s"emb:$mode:$cnt:$fp:${planeIds.mkString("_")}:$idCol:$vecCol"
    val planesPath = s"$indexDir/planes"; val bucketsPath = s"$indexDir/buckets"
    val stamp = new org.apache.hadoop.fs.Path(indexDir, "source.json")
    val fs = stamp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val existing =
      if (Dedup.readDigestStamp(spark, indexDir).contains(ident))
        try {
          val p = graft.util.ParquetSchemaMemo.read(spark, planesPath)
          val b = graft.util.ParquetSchemaMemo.read(spark, bucketsPath)
          p.select("pid", "pv", "bit"); b.select("bucket", "b_id", "bv", "bn")
          Some(EmbeddingIndex(p, b))
        } catch { case scala.util.control.NonFatal(_) => None }
      else None
    existing.getOrElse {
      // stamp deleted FIRST — same crash ordering as the digest sidecar
      fs.delete(stamp, false)
      val base = prepared(reference, idCol, vecCol)
      val rankExpr = planeIds.zipWithIndex.foldLeft(lit(0)) {
        case (acc, (id, i)) => acc + when(col("pid") === id, lit(1 << i)).otherwise(0)
      }
      base.filter(col("vec_id").isin(planeIds: _*))
        .select(col("vec_id").as("pid"), col("v").as("pv"))
        .withColumn("bit", rankExpr)
        .write.mode("overwrite").parquet(planesPath)
      graft.util.ParquetSchemaMemo.invalidate(planesPath)
      val planes = graft.util.ParquetSchemaMemo.read(spark, planesPath)
      bucketedWithBitPlanes(base, planes, CacheScope.unmanaged)
        .select(col("bucket"), col("vec_id").as("b_id"),
          col("v").as("bv"), col("nrm").as("bn"))
        .write.mode("overwrite").parquet(bucketsPath)
      graft.util.ParquetSchemaMemo.invalidate(bucketsPath)
      val out = fs.create(stamp, true)
      try out.write(s"""{"ident":"$ident"}"""
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
      EmbeddingIndex(planes,
        graft.util.ParquetSchemaMemo.read(spark, bucketsPath))
    }
  }

  /** [[embeddingNearDupsAgainstReference]] probing a persisted
    * [[EmbeddingIndex]]: per batch, only the BATCH is bucketed (one
    * plane-dot pass over batch vectors against the broadcast stored
    * planes) and joined to the stored buckets — same rows as the
    * recompute form, zero reference scans in the probe plan. */
  def embeddingNearDupsAgainstIndex(
      batch: DataFrame, idCol: String, vecCol: String,
      index: EmbeddingIndex, threshold: Double, roundDigits: Int = 4,
      scope: CacheScope = CacheScope.unmanaged): DataFrame = {
    val batB = bucketedWithBitPlanes(prepared(batch, idCol, vecCol),
      index.planes, scope)
    batB.join(index.buckets, Seq("bucket"))
      .withColumn("cos",
        round(Vectors.cosineWithNorms(col("v"), col("bv"), col("nrm"), col("bn")),
          roundDigits))
      .filter(col("cos") >= threshold)
      .select(col("vec_id").as("a"), col("b_id").as("b"), col("cos"))
  }

  /** IVF (inverted-file) ANN top-k: a KMeans coarse quantizer assigns
    * every vector to one of `nCentroids` cells; a query probes only its
    * `nProbe` nearest cells and ranks exact cosine within them.
    *
    * Scale shape: the cell assignment is one ML pass (sampled fit +
    * broadcast model transform); per query the scan shrinks to
    * ~nProbe/nCentroids of the corpus. Centroids are driver-sized by
    * construction (nCentroids vectors) — collecting them to build the
    * probe table is the sanctioned tiny-side pattern. With
    * nProbe == nCentroids this degrades gracefully to the exact
    * brute-force ranking (pinned by AnnRecallSpec). */
  def ivfTopK(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      queryIds: Seq[Int],
      nCentroids: Int,
      nProbe: Int,
      k: Int,
      seed: Long = 42L,
      roundDigits: Int = 4): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val spark = emb.sparkSession
    import spark.implicits._

    val base = prepared(emb, idCol, vecCol)
      .withColumn("fv", array_to_vector(col("v")))
    val km = new KMeans().setK(nCentroids).setSeed(seed)
      .setFeaturesCol("fv").setPredictionCol("cell").fit(base)
    val assigned = km.transform(base).drop("fv")

    // centroid table: nCentroids rows — broadcast probe ranking
    val centroids = km.clusterCenters.zipWithIndex
      .map { case (c, i) => (i, c.toArray.map(_.toFloat)) }
      .toSeq.toDF("cell", "cv")
    val q = assigned.filter(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id").as("q"), col("v").as("qv"), col("nrm").as("qn"))
    val probeW = Window.partitionBy(col("q"))
      .orderBy(col("dist").asc, col("cell").asc)
    val probes = q.crossJoin(broadcast(centroids))
      .withColumn("dist",
        Vectors.dot(col("qv"), col("qv")) - lit(2.0) * Vectors.dot(col("qv"), col("cv"))
          + Vectors.dot(col("cv"), col("cv")))
      .withColumn("__pr", row_number().over(probeW))
      .filter(col("__pr") <= nProbe)
      .select(col("q"), col("qv"), col("qn"), col("cell"))

    val scored = assigned.join(broadcast(probes),
        Seq("cell")).where(col("vec_id") =!= col("q"))
      .withColumn("cos",
        round(Vectors.cosineWithNorms(col("qv"), col("v"), col("qn"), col("nrm")),
          roundDigits))
      .select(col("q"), col("vec_id"), col("cos"))
    twoPhaseTopK(scored, k)
  }

  /** IVF with a DETERMINISTIC coarse quantizer: the "centroids" are a
    * fixed set of corpus vectors (by id) instead of KMeans means, so the
    * whole pipeline — assignment, probe ranking, in-cell scoring — is
    * pure relational algebra reproducible on any engine. This is the
    * oracle-gated twin of [[ivfTopK]]: same plan shape (broadcast
    * centroids → one assignment pass → probe only nProbe cells), only
    * the quantizer differs. Real deployments would refresh centroid ids
    * from a sampled ranking; the gate pins the engine mechanics.
    *
    * Assignment = argmax rounded cosine over centroids (ties → lowest
    * cell id). The per-vector window partitions on vec_id — dense,
    * skew-free keys — and its input is |corpus|×|centroids| rows from a
    * broadcast join, never a shuffle of the corpus against itself. */
  def ivfTopKDeterministic(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      queryIds: Seq[Int],
      centroidIds: Seq[Int],
      nProbe: Int,
      k: Int,
      roundDigits: Int = 4): DataFrame = {
    val base = prepared(emb, idCol, vecCol)
    val centroids = base.filter(col("vec_id").isin(centroidIds: _*))
      .select(col("vec_id").as("cell"), col("v").as("cv"), col("nrm").as("cn"))

    // argmax(cosine, ties → lowest cell) as a max_by HASH AGGREGATE:
    // map-side partial folds the |centroids| candidate rows per vector
    // before the shuffle — no sort, no per-key window exchange of the
    // corpus. struct ordering is (cos, -cell) lexicographic, so the tie
    // rule matches the oracle's ORDER BY cos DESC, cell ASC.
    val assigned = base.join(broadcast(centroids))
      .withColumn("ccos",
        round(Vectors.cosineWithNorms(col("v"), col("cv"), col("nrm"), col("cn")),
          roundDigits))
      .groupBy(col("vec_id"))
      .agg(
        max_by(col("cell"), struct(col("ccos"), -col("cell"))).as("cell"),
        first(col("v")).as("v"), first(col("nrm")).as("nrm"))
      .select(col("vec_id"), col("v"), col("nrm"), col("cell"))

    val q = base.filter(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id").as("q"), col("v").as("qv"), col("nrm").as("qn"))
    val pw = Window.partitionBy(col("q"))
      .orderBy(col("pcos").desc, col("cell").asc)
    val probes = q.join(broadcast(centroids))
      .withColumn("pcos",
        round(Vectors.cosineWithNorms(col("qv"), col("cv"), col("qn"), col("cn")),
          roundDigits))
      .withColumn("__pr", row_number().over(pw))
      .filter(col("__pr") <= nProbe)
      .select(col("q"), col("qv"), col("qn"), col("cell"))

    val scored = assigned.join(broadcast(probes), Seq("cell"))
      .where(col("vec_id") =!= col("q"))
      .withColumn("cos",
        round(Vectors.cosineWithNorms(col("qv"), col("v"), col("qn"), col("nrm")),
          roundDigits))
      .select(col("q"), col("vec_id"), col("cos"))
    twoPhaseTopK(scored, k)
  }

  /** Embedding near-duplicate pairs: all (a < b) with rounded cosine ≥
    * threshold. Brute-force O(n²) form — the LSH-bucketed variant above
    * is the scale path; this is the oracle-checkable exact form. */
  def cosineNearDupPairs(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double,
      roundDigits: Int = 4): DataFrame = {
    val base = prepared(emb, idCol, vecCol)
    val right = base.select(col("vec_id").as("b_id"), col("v").as("bv"),
      col("nrm").as("bn"))
    base.join(right, col("vec_id") < col("b_id"))
      .withColumn("cos",
        round(Vectors.cosineWithNorms(col("v"), col("bv"), col("nrm"), col("bn")),
          roundDigits))
      .filter(col("cos") >= threshold)
      .select(col("vec_id").as("a"), col("b_id").as("b"), col("cos"))
  }

  /** Per-group element-wise mean vector (class/language/source
    * centroid). The posexplode fans out n·d rows, but the mean is a
    * map-side-combinable partial agg, so the shuffle carries one row
    * per (group, dim, partition) and the final state is |G|·d rows —
    * independent of corpus size. Reassembly sorts (dim, mean) structs
    * per group, so the centroid's element order never depends on
    * arrival order. */
  def groupCentroids(df: DataFrame, groupCol: String, vecCol: String): DataFrame =
    df.select(col(groupCol), posexplode(Vectors.toDouble(col(vecCol))).as(Seq("pos", "x")))
      .groupBy(col(groupCol), col("pos")).agg(avg(col("x")).as("m"))
      .groupBy(col(groupCol))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
        s => s.getField("m")).as("centroid"))

  /** Cosine of every vector to its own group's centroid — the
    * embedding-side outlier/quality score (low cos ⇒ the vector sits
    * far from its labeled cluster: mislabeled, noisy, or off-domain).
    * Centroids are |G| rows, so the re-join broadcasts.
    *
    * The input IS consumed twice (centroid agg + probe side), and
    * deliberately NOT persisted — unlike tfidfTopTerms' tf (a
    * post-aggregation relation far smaller than its input), the shared
    * relation here is the raw vector table itself: caching it costs
    * corpus-sized memory/disk, while the second consumer is a pruned
    * columnar re-scan feeding a broadcast join. At 100 TB a re-scan is
    * the cheaper side of that trade; callers who know the table is
    * small can persist it before calling. */
  def centroidCosine(
      df: DataFrame, idCol: String, groupCol: String, vecCol: String,
      roundDigits: Int = 4): DataFrame =
    df.join(broadcast(groupCentroids(df, groupCol, vecCol)), Seq(groupCol))
      .select(col(idCol), col(groupCol),
        round(Vectors.cosine(Vectors.toDouble(col(vecCol)), col("centroid")),
          roundDigits).as("cos"))

  /** Semantic deduplication (the SemDeDup shape, Abbas et al. 2023):
    * embedding-space near-duplicates — paraphrases, re-renders,
    * templated variants that no lexical dedup catches — are grouped and
    * all but one representative per group dropped. Pipeline: LSH-bucketed
    * cosine pairs at `threshold` ([[cosineNearDupPairsLsh]] — candidates
    * only within a hyperplane bucket, never all-pairs) → connected
    * components ([[Dedup.connectedComponents]] — a doc transitively
    * near-dup to a kept doc is still a dup) → keep each component's
    * min-id node. Under min-label propagation the component label IS its
    * min id, so the survivor test is `cluster == id` — no extra agg.
    * SemDeDup proper clusters with k-means and keeps per-cluster
    * farthest-from-centroid; the bucketed-pairs + CC form keeps the
    * keep/drop semantics deterministic (oracle-checkable) and shares the
    * x60 cluster machinery.
    *
    * Output: the input rows whose id survives (semi-join — column set
    * preserved, so downstream curation stages compose unchanged).
    *
    * Scale shape: pairs ∝ bucket collisions, CC per x60's analysis
    * (pre-partitioned edge table, delta iteration, pointer-jump guard),
    * and the final semi-join shuffles ids only (AQE broadcasts the
    * survivor side when small). */
  def semanticDedup(
      emb: DataFrame, idCol: String, vecCol: String,
      planeIds: Seq[Int], threshold: Double,
      scope: CacheScope = CacheScope.unmanaged): DataFrame = {
    val pairs = scope.persist(
      cosineNearDupPairsLsh(emb, idCol, vecCol, planeIds, threshold, scope = scope))
    val clusters = Dedup.connectedComponents(
      emb.select(col(idCol)), idCol, pairs, "a", "b", scope = scope)
    val survivors = clusters.filter(col("cluster") === col(idCol)).select(col(idCol))
    emb.join(survivors, Seq(idCol), "left_semi")
  }

  /** Lloyd's k-means over the embedding column — the clustering stage
    * of SemDeDup-style semantic curation (Abbas et al. 2023 cluster
    * with k-means, then prune within clusters) and of cluster-balanced
    * training-data mixing. Deterministic and oracle-checkable:
    *
    *   - init: the `k` lowest-`idCol` vectors, cluster index = id rank
    *     (no random seeds — reproducible across engines and runs);
    *   - `iters` rounds of assign → recompute means; a cluster that
    *     loses all members keeps its previous centroid;
    *   - centroid components are ROUNDED to `centroidDigits` after
    *     each mean. Both engines then hold the double nearest the same
    *     decimal, so the next round's distances are computed from
    *     bit-identical inputs and argmin ties cannot diverge on
    *     summation-order ulps (the mean itself is order-sensitive; the
    *     quantize step is what makes the fixpoint portable);
    *   - output: final assignment under the post-`iters` centroids —
    *     (vec_id, cluster, dist2 rounded to `distDigits`).
    *
    * Scale shape: centroids are DRIVER state — k×dim doubles,
    * independent of corpus size (the same shape MLlib's KMeans uses,
    * and the sanctioned broadcast-scalar pattern: the per-iteration
    * collect is k×dim rows, never data). Assignment is therefore
    * MAP-ONLY: the argmin over k centroid literals compiles to one
    * codegen'd `array_min(array(struct(dist_i, i)...))` per row — no
    * crossJoin, no shuffle, no window. The only exchange per iteration
    * is the centroid update: posexplode → partial-agg avg keyed on
    * (cluster, pos), k×dim groups — map-side combine reduces it to
    * k×dim×partitions rows on the wire. dist² is expanded as
    * |v|² − 2·v·c + |c|² so |c|² folds to a driver constant and v·c is
    * one [[Vectors.dot]] codegen loop per centroid. */
  def kmeans(
      emb: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int,
      centroidDigits: Int = 6, distDigits: Int = 4): DataFrame = {
    val cents = kmeansCentroids(emb, idCol, vecCol, k, iters, centroidDigits)
    val fin = kmeansBest(cents)
    emb.select(col(idCol).cast("long").as("vec_id"),
        Vectors.toDouble(col(vecCol)).as("v"))
      .select(col("vec_id"),
        fin.getField("cidx").cast("long").as("cluster"),
        round(fin.getField("d"), distDigits).as("dist2"))
  }

  /** The Lloyd's loop of [[kmeans]], returning the final centroids as
    * driver state (index = cluster id) for callers that compose the
    * assignment with further per-row work ([[semanticDedupKmeans]]).
    * `onRound(i, seconds)` is the in-run telemetry hook
    * (KmeansScaleDemo; the [[graft.operators.Graph.pageRank]]
    * pattern — measure rounds inside one run, not across runs). */
  def kmeansCentroids(
      emb: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int, centroidDigits: Int = 6,
      onRound: (Int, Double) => Unit = (_, _) => ()): Array[Seq[Double]] = {
    require(k > 0 && iters >= 0, s"need k>0, iters>=0; got k=$k iters=$iters")
    val e = emb.select(col(idCol).cast("long").as("vec_id"),
      Vectors.toDouble(col(vecCol)).as("v"))

    // Driver-side centroid state, init = the k lowest-id vectors.
    var cents: Array[Seq[Double]] = e.orderBy("vec_id").limit(k).collect()
      .map(_.getSeq[Double](1))
    require(cents.length == k, s"corpus has ${cents.length} rows < k=$k")

    for (rnd <- 1 to iters) {
      val t0 = System.nanoTime()
      val assigned = e.withColumn("cidx", kmeansBest(cents).getField("cidx"))
      val means = assigned
        .select(col("cidx"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy(col("cidx"), col("pos"))
        .agg(round(avg(col("x")), centroidDigits).as("m"))
        .groupBy(col("cidx"))
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
          s => s.getField("m")).as("c"))
        .collect()
        .map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
      cents = cents.zipWithIndex.map { case (old, i) => means.getOrElse(i, old) }
      onRound(rnd, (System.nanoTime() - t0) / 1e9)
    }
    cents
  }

  /** X131 — top principal component by distributed power iteration:
    * the dominant eigenvector of the (centered) covariance — the
    * embedding drift axis, the "one direction that explains most
    * variance" that anisotropy diagnostics and whitening start from.
    * Never materializes the d×d covariance: each round is one
    * MAP-ONLY pass computing the per-row centered projection
    * `s = x·v − μ·v` (the [[kmeans]] codegen-dot kernel against a
    * driver literal) and one posexplode aggregate for
    * `w_j = Σ s·x_j − μ_j·Σs` — shuffle ∝ dimensions, data touched
    * once per round.
    *
    * Portability (the kmeans discipline, applied to an eigenvector):
    * μ and the per-dimension sums accumulate in DECIMAL (exact,
    * addition-order-free); every driver-side dot runs as the SAME
    * sequential left-to-right fold the engines' list-dot kernels use;
    * the normalized vector quantizes through DECIMAL(18,8) to
    * `digits` between rounds, so both engines iterate from
    * bit-identical doubles. Deterministic init = the first basis
    * vector (sign convention follows from it).
    */
  def principalComponent(
      emb: DataFrame, idCol: String, vecCol: String,
      iters: Int = 2, digits: Int = 6): DataFrame = {
    require(iters >= 1, s"need iters >= 1, got $iters")
    val spark = emb.sparkSession
    val e = emb.select(col(idCol).cast("long").as("vec_id"),
      Vectors.toDouble(col(vecCol)).as("v"))
    val dec = org.apache.spark.sql.types.DecimalType(28, 8)
    def q6(x: Double): Double = BigDecimal(x)
      .setScale(8, BigDecimal.RoundingMode.HALF_UP)
      .setScale(digits, BigDecimal.RoundingMode.HALF_UP).toDouble
    val mu: Array[Double] = e
      .select(posexplode(col("v")).as(Seq("pos", "x")))
      .groupBy(col("pos"))
      .agg((sum(col("x").cast(dec)).cast("double") / count(lit(1)))
        .as("raw"))
      .orderBy("pos").collect().map(r => q6(r.getDouble(1)))
    val dim = mu.length
    var v: Array[Double] = Array.tabulate(dim)(i => if (i == 0) 1.0 else 0.0)
    for (_ <- 1 to iters) {
      // μ·v as the sequential fold both engines' list-dot kernels run
      val muDotV = mu.zip(v).foldLeft(0.0) { case (acc, (m, c)) =>
        acc + m * c
      }
      val s = Vectors.dot(col("v"), typedLit(v.toSeq)) - lit(muDotV)
      val sums = e.select(s.as("s"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy(col("pos"))
        .agg(sum((col("s") * col("x")).cast(dec)).cast("double").as("sx"),
          sum(col("s").cast(dec)).cast("double").as("ss"))
        .orderBy("pos").collect()
      val w = sums.map(r => r.getDouble(1) - mu(r.getInt(0)) * r.getDouble(2))
      val norm = math.sqrt(w.foldLeft(0.0)((acc, x) => acc + x * x))
      v = w.map(x => q6(x / norm))
    }
    import spark.implicits._
    v.zipWithIndex.map { case (l, i) => (i.toLong, l) }.toSeq
      .toDF("pos", "loading")
  }

  /** X144 — embedding-geometry health: mean vector norm, the norm of
    * the mean vector, and the anisotropy ratio `‖μ‖²/E[‖x‖²]` — the
    * expected cosine between two random vectors. An isotropic,
    * well-spread embedding space scores ≈ 0; a collapsed ("cone")
    * space scores near 1 and silently breaks every cosine-threshold
    * dedup/ANN knob downstream. The one-row check to run BEFORE
    * trusting a new embedding model in the curation stack.
    *
    * One posexplode aggregate (Σx_j and Σx_j² per dimension in exact
    * DECIMAL) + one dims-sized reduction — data touched once.
    * `E[x]·E[x]` and the norms assemble from exact decimal sums in a
    * fixed per-dimension order (list-kernel association), stabilized
    * through DECIMAL(18,8).
    */
  def embeddingStats(emb: DataFrame, idCol: String, vecCol: String,
      roundDigits: Int = 6): DataFrame = {
    val e = emb.select(col(idCol).cast("long").as("vec_id"),
      Vectors.toDouble(col(vecCol)).as("v"))
    val dec = org.apache.spark.sql.types.DecimalType(28, 8)
    val stable = org.apache.spark.sql.types.DecimalType(18, 8)
    val perDim = e.select(posexplode(col("v")).as(Seq("pos", "x")))
      .groupBy(col("pos"))
      .agg(sum(col("x").cast(dec)).as("__sx"),
        sum((col("x") * col("x")).cast(dec)).as("__sxx"),
        count(lit(1)).as("__n"))
    // μ_j = Σx/n (double on exact operands); Σ_j μ_j² in exact decimal
    // of identically-computed doubles; E‖x‖² = Σ_j Σx²_j / n
    val muSq = (col("__sx").cast("double") / col("__n")) *
      (col("__sx").cast("double") / col("__n"))
    val agg = perDim.agg(
      sum(muSq.cast(dec)).as("__mu2"),
      sum(col("__sxx")).as("__exx"),
      first(col("__n")).as("__n"))
    agg.select(
      col("__n").as("n_vectors"),
      round(sqrt(col("__exx").cast("double") / col("__n"))
        .cast(stable), roundDigits).cast("double").as("rms_norm"),
      round(sqrt(col("__mu2").cast("double")).cast(stable), roundDigits)
        .cast("double").as("mean_vector_norm"),
      round((col("__mu2").cast("double")
        / (col("__exx").cast("double") / col("__n"))).cast(stable),
        roundDigits).cast("double").as("anisotropy"))
  }

  /** Argmin over the k centroid literals for the row's `v` column:
    * struct(dist², cidx) through `array_min` — lexicographic struct
    * ordering breaks exact-dist ties toward the lowest cluster index.
    * Map-only: compiles to per-row codegen, no join/shuffle. */
  private def kmeansBest(cs: Array[Seq[Double]]): Column = {
    val vSq = Vectors.sq(col("v"))
    array_min(array(cs.zipWithIndex.map { case (c, i) =>
      // |c|² on the driver: sequential left-to-right sum, the same
      // order both engines' list dot uses — bit-identical.
      val cSq = c.foldLeft(0.0)((acc, x) => acc + x * x)
      struct(
        (vSq - lit(2.0) * Vectors.dot(col("v"), typedLit(c)) + lit(cSq))
          .as("d"),
        lit(i).as("cidx"))
    }: _*))
  }

  /** SemDeDup with its ORIGINAL prune rule (Abbas et al. 2023 §2):
    * k-means-cluster the corpus, generate candidate pairs only WITHIN
    * a cluster, connect near-dup components, and keep each component's
    * member FARTHEST from its cluster centroid (the paper's
    * low-centroid-similarity choice: among semantic duplicates, the
    * least-templated exemplar carries the most information) — tie →
    * lowest id. [[semanticDedup]] is the LSH-bucketed variant with a
    * keep-lowest-id rule; this form is the paper-faithful one, now
    * expressible because [[kmeans]] exists.
    *
    * Scale shape: assignment is map-only ([[kmeansBest]]); the pair
    * join fans out per k-means cluster — k controls the candidate
    * budget exactly as the paper tunes it (their k ≈ n/10⁴; buckets
    * shrink quadratically in k). Components and the per-component
    * argmax are x60's CC machinery plus ONE map-side-combinable
    * min(struct) agg. Output: the surviving rows as
    * (vec_id, cluster, dist2). */
  def semanticDedupKmeans(
      emb: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int, threshold: Double,
      roundDigits: Int = 4,
      scope: CacheScope = CacheScope.unmanaged): DataFrame = {
    val cents = kmeansCentroids(emb, idCol, vecCol, k, iters)
    val b = kmeansBest(cents)
    // persisted: the assignment feeds the pair join (both sides), the
    // CC node set, and the survivor semi-join — without it each
    // consumer re-runs the k-term argmin scan.
    val assigned = scope.persist(prepared(emb, idCol, vecCol)
      .withColumn("__b", b)
      .select(col("vec_id"), col("v"), col("nrm"),
        col("__b").getField("cidx").cast("long").as("kc"),
        round(col("__b").getField("d"), roundDigits).as("dist2")))
    val right = assigned.select(col("kc"), col("vec_id").as("b_id"),
      col("v").as("bv"), col("nrm").as("bn"))
    val pairs = assigned.join(right, Seq("kc")).where(col("vec_id") < col("b_id"))
      .withColumn("cos",
        round(Vectors.cosineWithNorms(col("v"), col("bv"), col("nrm"), col("bn")),
          roundDigits))
      .filter(col("cos") >= threshold)
      .select(col("vec_id").as("a"), col("b_id").as("b"))
    val comp = Dedup.connectedComponents(
        assigned.select(col("vec_id")), "vec_id", pairs, "a", "b", scope = scope)
      .withColumnRenamed("cluster", "component")
    val survivors = comp
      .join(assigned.select(col("vec_id"), col("dist2")), Seq("vec_id"))
      .groupBy(col("component"))
      .agg(min(struct((-col("dist2")).as("nd"), col("vec_id").as("id"))).as("best"))
      .select(col("best").getField("id").as("vec_id"))
    assigned.join(survivors, Seq("vec_id"), "left_semi")
      .select(col("vec_id"), col("kc").as("cluster"), col("dist2"))
  }

  /** kNN label-consistency audit — the noisy-label detection signal
    * (Confident-Learning-adjacent, Northcutt et al. 2021 shape): for
    * each vector, the fraction of its k nearest neighbors (cosine)
    * that share its label. A clean point sits among same-labeled
    * neighbors (frac → 1); a mislabeled, boundary, or off-domain
    * point does not — rank ascending by `frac_same` and audit the
    * head. Complements [[centroidCosine]]: the centroid score flags
    * far-from-class points, the kNN score flags points deep inside
    * the WRONG class, which centroid distance alone cannot see.
    *
    * Neighbors are searched within the row's [[kmeans]] cluster only —
    * `kClusters` is the candidate-budget knob exactly as in
    * [[semanticDedupKmeans]] (cost ∝ Σ cluster²; raise kClusters to
    * shrink buckets). Cosines are rounded before ranking (ties →
    * lowest neighbor id) so the neighbor set is engine-reproducible.
    * Rows in singleton clusters have no candidates and no output row.
    * The per-vec top-k window runs over cluster-bounded candidates;
    * for pathological cluster sizes compose with the two-phase
    * pattern ([[twoPhaseTopK]]). */
  def knnLabelConsistency(
      emb: DataFrame, idCol: String, vecCol: String, labelCol: String,
      kNeighbors: Int, kClusters: Int, iters: Int,
      roundDigits: Int = 4,
      scope: CacheScope = CacheScope.unmanaged): DataFrame = {
    val cents = kmeansCentroids(emb, idCol, vecCol, kClusters, iters)
    // raw float vectors (see [[prepared]]); DotProduct promotes per
    // element, so distances equal kmeansCentroids' float64 view.
    val assigned = scope.persist(
      emb.select(col(idCol).cast("long").as("vec_id"),
          col(labelCol).cast("long").as("label"), col(vecCol).as("v"))
        .withColumn("nrm", Vectors.norm(col("v")))
        .withColumn("kc", kmeansBest(cents).getField("cidx")))
    val right = assigned.select(col("kc"), col("vec_id").as("b_id"),
      col("label").as("b_label"), col("v").as("bv"), col("nrm").as("bn"))
    val cand = assigned.join(right, Seq("kc"))
      .where(col("vec_id") =!= col("b_id"))
      .withColumn("cos",
        round(Vectors.cosineWithNorms(col("v"), col("bv"), col("nrm"), col("bn")),
          roundDigits))
    val w = Window.partitionBy(col("vec_id")).orderBy(col("cos").desc, col("b_id"))
    cand.withColumn("__r", row_number().over(w))
      .filter(col("__r") <= kNeighbors)
      .groupBy(col("vec_id"), col("label"))
      .agg(count(lit(1)).as("n_neighbors"),
        round(avg(when(col("b_label") === col("label"), 1.0d).otherwise(0.0d)),
          roundDigits).as("frac_same"))
      .select(col("vec_id"), col("label"), col("n_neighbors"), col("frac_same"))
  }

  /** Two-phase distributed top-k per query group (see object doc). */
  private def twoPhaseTopK(scored: DataFrame, k: Int): DataFrame = {
    val local = scored.withColumn("__part", spark_partition_id())
    val w1 = Window.partitionBy(col("q"), col("__part"))
      .orderBy(col("cos").desc, col("vec_id"))
    val survivors = local
      .withColumn("__r", row_number().over(w1)).filter(col("__r") <= k)
    val w2 = Window.partitionBy(col("q")).orderBy(col("cos").desc, col("vec_id"))
    survivors
      .withColumn("rank", row_number().over(w2).cast("bigint"))
      .filter(col("rank") <= k)
      .select(col("q"), col("rank"), col("vec_id"), col("cos"))
  }

  // ── X169: product quantization (Jégou et al., PAMI 2011) ──────────
  // The standard ANN memory-compression layer next to IVF (x45/x53):
  // split each d-dim vector into m subspaces, k-means each subspace to
  // k codewords, store each vector as m small codes. A billion-vector
  // corpus at d=768 float32 (3 KB/vec) becomes m=8 bytes/vec + one
  // shared codebook — the difference between "the index fits in
  // executor memory" and "it does not". Search uses ADC (asymmetric
  // distance): per query, an m×k distance table is driver-computed,
  // and each row's approximate distance is m table lookups — map-only,
  // no vector math per candidate.

  /** Train per-subspace codebooks: m independent [[kmeansCentroids]]
    * runs over the vector slices (same deterministic discipline —
    * lowest-id init, decimal-rounded means — so codebooks are
    * reproducible across runs and engines). `dim` must divide into m
    * equal subspaces. Driver state: m·k·(d/m) doubles — model-sized. */
  def pqTrainCodebooks(
      emb: DataFrame, idCol: String, vecCol: String,
      m: Int, k: Int, iters: Int = 3): Array[Array[Seq[Double]]] = {
    require(m >= 1 && k >= 1 && iters >= 0,
      s"need m>=1, k>=1, iters>=0; got m=$m k=$k iters=$iters")
    val dim = emb.select(size(col(vecCol))).head().getInt(0)
    require(dim % m == 0, s"dim $dim must split into m=$m equal subspaces")
    val sub = dim / m
    (0 until m).map { s =>
      val sliced = emb.select(col(idCol),
        slice(Vectors.toDouble(col(vecCol)), s * sub + 1, sub).as("__subv"))
      kmeansCentroids(sliced, idCol, "__subv", k, iters)
    }.toArray
  }

  /** Encode each vector as its m nearest-codeword indices (ties →
    * lowest codeword, the [[kmeans]] rule). Map-only against the
    * broadcast codebook literals; output (vec_id, codes int array). */
  def pqEncode(
      emb: DataFrame, idCol: String, vecCol: String,
      codebooks: Array[Array[Seq[Double]]]): DataFrame = {
    val m = codebooks.length
    val sub = codebooks(0)(0).length
    val base = emb.select(col(idCol).cast("long").as("vec_id"),
      Vectors.toDouble(col(vecCol)).as("__v"))
    val codeCols = (0 until m).map { s =>
      val sv = slice(col("__v"), s * sub + 1, sub)
      array_min(array(codebooks(s).zipWithIndex.map { case (c, i) =>
        val cSq = c.foldLeft(0.0)((acc, x) => acc + x * x)
        struct(
          (Vectors.sq(sv) - lit(2.0) * Vectors.dot(sv, typedLit(c))
            + lit(cSq)).as("d"),
          lit(i).as("cidx"))
      }: _*)).getField("cidx")
    }
    base.select(col("vec_id"), array(codeCols: _*).as("codes"))
  }

  /** ADC top-k: for each query id, the k nearest corpus vectors by
    * PQ-approximate squared distance. The query's exact subvectors
    * build an m×k lookup table ON THE DRIVER (sequential-fold dots —
    * reproducible); each corpus row then pays m `element_at` lookups
    * on its codes — a pure codegen projection, no per-pair vector
    * math — and the top-k rides one TakeOrderedAndProject per query.
    * Returns (q, rank, vec_id, approx_dist2); ties → lowest vec_id;
    * the query row itself is excluded.
    */
  def pqTopK(
      emb: DataFrame, idCol: String, vecCol: String,
      codebooks: Array[Array[Seq[Double]]],
      queryIds: Seq[Long], k: Int,
      roundDigits: Int = 4,
      scope: CacheScope = CacheScope.unmanaged): DataFrame = {
    require(queryIds.nonEmpty && k >= 1, "need queries and k >= 1")
    val m = codebooks.length
    val sub = codebooks(0)(0).length
    val codes = scope.persist(pqEncode(emb, idCol, vecCol, codebooks))
    val queries = emb
      .filter(col(idCol).cast("long").isin(queryIds.map(q => q: Any): _*))
      .select(col(idCol).cast("long"), Vectors.toDouble(col(vecCol)))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val stable = org.apache.spark.sql.types.DecimalType(18, 8)
    queryIds.map { q =>
      val qv = queries.getOrElse(q,
        sys.error(s"query id $q not present in the corpus"))
      // m×k driver table: ||q_s − c||² with the sequential-fold
      // discipline (same association as the engine's list dots)
      val table: Seq[Seq[Double]] = (0 until m).map { s =>
        val qs = qv.slice(s * sub, (s + 1) * sub)
        codebooks(s).toSeq.map { c =>
          qs.zip(c).foldLeft(0.0) { case (acc, (a, b)) =>
            acc + (a - b) * (a - b)
          }
        }
      }
      val dist = (0 until m).map { s =>
        element_at(typedLit(table(s)),
          element_at(col("codes"), s + 1) + 1)
      }.reduce(_ + _)
      codes.filter(col("vec_id") =!= q)
        .select(lit(q).as("q"), col("vec_id"),
          round(dist.cast(stable), roundDigits).cast("double")
            .as("approx_dist2"))
        .orderBy(col("approx_dist2"), col("vec_id")).limit(k)
    }.reduce(_ unionAll _)
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("q"))
          .orderBy(col("approx_dist2"), col("vec_id"))).cast("bigint"))
      .select(col("q"), col("rank"), col("vec_id"), col("approx_dist2"))
  }

  // ── X181: IVFADC (Jégou et al., PAMI 2011 §IV) ─────────────────────
  // The IVF coarse quantizer (x53's deterministic corpus-vector
  // centroids) composed with PQ codes over the RESIDUALS v − c(v) —
  // the standard billion-vector layout: the inverted file prunes the
  // scan to nProbe cells, the residual PQ codes shrink each stored
  // vector to m bytes, and residual quantization is strictly finer
  // than raw-vector PQ because each codebook only has to cover a
  // cell-sized neighborhood, not the whole space.

  /** IVFADC top-k: coarse-assign every vector to its nearest centroid
    * (exact L2, ties → lowest cell id — matching ADC's metric, unlike
    * the cosine coarse ranking of [[ivfTopKDeterministic]]), PQ-encode
    * the residual v − c(v), and per query probe only the `nProbe`
    * nearest cells, ranking candidates by the ADC lookup distance
    * ‖(v−c) − (q−c)‖² with the table rebuilt per probed cell from the
    * query's OWN residual q − c.
    *
    * Scale shape: centroids and codebooks are driver/model state
    * (|cells|·d + m·k·(d/m) doubles); assignment, residual, and encode
    * are map-only passes against broadcast literals; the probe plan
    * scans ~nProbe/|cells| of the code table (partition-prunable if
    * the codes persist partitioned by cell) with m `element_at`
    * lookups per candidate — no vector math per pair anywhere in the
    * search path. Returns (q, rank, vec_id, approx_dist2); ties →
    * lowest vec_id; the query row itself is excluded. Recall vs brute
    * force is pinned by AnnRecallSpec (ML tier per SURVEY §5.3).
    */
  def ivfadcTopK(
      emb: DataFrame, idCol: String, vecCol: String,
      queryIds: Seq[Long], centroidIds: Seq[Int],
      m: Int, codewords: Int, nProbe: Int, k: Int,
      iters: Int = 3, roundDigits: Int = 4,
      scope: CacheScope = CacheScope.unmanaged): DataFrame = {
    require(queryIds.nonEmpty && centroidIds.nonEmpty,
      "need queries and centroids")
    require(nProbe >= 1 && nProbe <= centroidIds.length,
      s"nProbe $nProbe out of [1, ${centroidIds.length}]")
    require(k >= 1, s"k must be >= 1: $k")
    val base = emb.select(col(idCol).cast("long").as("vec_id"),
      Vectors.toDouble(col(vecCol)).as("__v"))
    val (cents, cb, codes) = ivfadcBuild(base, centroidIds, m,
      codewords, iters, scope)
    // query vectors to the driver (bounded by |queries|)
    val queries = base
      .filter(col("vec_id").isin(queryIds.map(q => q: Any): _*))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    queryIds.foreach(q => require(queries.contains(q),
      s"query id $q not present in the corpus"))
    ivfadcSearch(codes, cents, cb,
      queryIds.map(q => q -> queries(q)), nProbe, k, roundDigits,
      excludeSelfId = true)
  }

  /** Build the IVFADC artifacts: coarse assignment, residual-trained
    * codebooks, (vec_id, cell, codes) frame. Shared by [[ivfadcTopK]]
    * and [[ensureIvfAdcIndex]]. */
  private def ivfadcBuild(
      base: DataFrame, centroidIds: Seq[Int],
      m: Int, codewords: Int, iters: Int, scope: CacheScope)
      : (Map[Int, Seq[Double]], Array[Array[Seq[Double]]], DataFrame) = {
    // driver centroid table — |cells| vectors, the sanctioned
    // model-state collect (kmeansCentroids shape)
    val cellIds = centroidIds.sorted
    val cents: Map[Int, Seq[Double]] = base
      .filter(col("vec_id").isin(cellIds.map(i => i.toLong): _*))
      .collect().map(r => r.getLong(0).toInt -> r.getSeq[Double](1)).toMap
    val missing = cellIds.filterNot(cents.contains)
    require(missing.isEmpty, s"centroid ids not in corpus: $missing")
    def l2ToCent(v: Column, c: Seq[Double]): Column = {
      val cSq = c.foldLeft(0.0)((acc, x) => acc + x * x)
      Vectors.sq(v) - lit(2.0) * Vectors.dot(v, typedLit(c)) + lit(cSq)
    }
    // coarse assignment: argmin L2 via one array_min(struct) — the
    // pqEncode idiom; struct order (dist, cell) breaks ties low
    val assignExpr = array_min(array(cellIds.map { cid =>
      struct(l2ToCent(col("__v"), cents(cid)).as("d"),
        lit(cid).as("cell"))
    }: _*)).getField("cell")
    // residual v − c(cell): a when-chain over the bounded cell set
    // selects the centroid literal, zip_with subtracts element-wise
    val centCol = cellIds.tail.foldLeft(
      when(col("cell") === cellIds.head, typedLit(cents(cellIds.head)))) {
      (acc, cid) => acc.when(col("cell") === cid, typedLit(cents(cid)))
    }
    val resid = scope.persist(base
      .withColumn("cell", assignExpr)
      .withColumn("__res", zip_with(col("__v"), centCol, (a, b) => a - b))
      .select(col("vec_id"), col("cell"), col("__res")))
    val cb = pqTrainCodebooks(resid, "vec_id", "__res", m, codewords, iters)
    val codes = scope.persist(
      pqEncode(resid, "vec_id", "__res", cb)
        .join(resid.select(col("vec_id"), col("cell")), "vec_id"))
    (cents, cb, codes)
  }

  /** ADC probe against a (vec_id, cell, codes) frame. One plan per
    * (query, probed cell) — bounded by |queries|·nProbe; each scans
    * ONE cell's codes (partition-pruned when the frame is
    * cell-partitioned parquet) with m lookups per candidate. */
  private def ivfadcSearch(
      codes: DataFrame,
      cents: Map[Int, Seq[Double]],
      cb: Array[Array[Seq[Double]]],
      queries: Seq[(Long, Seq[Double])],
      nProbe: Int, k: Int, roundDigits: Int,
      excludeSelfId: Boolean): DataFrame = {
    val m = cb.length
    val sub = cb(0)(0).length
    val cellIds = cents.keys.toSeq.sorted
    val stable = org.apache.spark.sql.types.DecimalType(18, 8)
    queries.map { case (q, qv) =>
      // probe ranking on the driver: exact L2 to each centroid,
      // sequential-fold dots (reproducible), ties → lowest cell
      val probed = cellIds.map { cid =>
        val c = cents(cid)
        val d = qv.zip(c).foldLeft(0.0) { case (acc, (a, b)) =>
          acc + (a - b) * (a - b)
        }
        (d, cid)
      }.sorted.take(nProbe).map(_._2)
      probed.map { cid =>
        // per probed cell the ADC table comes from the query's OWN
        // residual against THAT cell's centroid
        val qres = qv.zip(cents(cid)).map { case (a, b) => a - b }
        val table: Seq[Seq[Double]] = (0 until m).map { s =>
          val qs = qres.slice(s * sub, (s + 1) * sub)
          cb(s).toSeq.map { c =>
            qs.zip(c).foldLeft(0.0) { case (acc, (a, b)) =>
              acc + (a - b) * (a - b)
            }
          }
        }
        val dist = (0 until m).map { s =>
          element_at(typedLit(table(s)),
            element_at(col("codes"), s + 1) + 1)
        }.reduce(_ + _)
        codes.filter(col("cell") === cid &&
            (if (excludeSelfId) col("vec_id") =!= q else lit(true)))
          .select(lit(q).as("q"), col("vec_id"),
            round(dist.cast(stable), roundDigits).cast("double")
              .as("approx_dist2"))
      }.reduce(_ unionAll _)
        .orderBy(col("approx_dist2"), col("vec_id")).limit(k)
    }.reduce(_ unionAll _)
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("q"))
          .orderBy(col("approx_dist2"), col("vec_id"))).cast("bigint"))
      .select(col("q"), col("rank"), col("vec_id"), col("approx_dist2"))
  }

  /** A persisted IVFADC index: driver model state (centroids +
    * codebooks) and the cell-partitioned code table. */
  final case class IvfAdcIndex(
      cents: Map[Int, Seq[Double]],
      codebooks: Array[Array[Seq[Double]]],
      codes: DataFrame)

  /** X197 — memoized IVFADC index build (the x77/x95 persisted-index
    * discipline applied to the billion-vector layout): codes land as
    * parquet PARTITIONED BY cell — a probe of nProbe cells is a
    * partition-pruned scan, zero full-corpus reads — and the m·k
    * codebooks + |cells| centroids persist as a tiny model table. The
    * `source.json` stamp carries the corpus identity + every build
    * parameter; a healthy ensure reloads without re-reading corpus
    * vectors, any mismatch (new corpus rows, changed m/k/cells)
    * rebuilds, and the stamp is deleted FIRST so a crash mid-write
    * leaves "no index, rebuild", never a half-written one trusted.
    */
  def ensureIvfAdcIndex(
      reference: DataFrame, idCol: String, vecCol: String,
      centroidIds: Seq[Int], m: Int, codewords: Int,
      indexDir: String, iters: Int = 3): IvfAdcIndex = {
    val spark = reference.sparkSession
    val (mode, cnt, fp) = Dedup.corpusIdentity(reference, idCol, vecCol)
    val ident = s"ivfadc:$mode:$cnt:$fp:" +
      s"${centroidIds.sorted.mkString("_")}:$m:$codewords:$iters:" +
      s"$idCol:$vecCol"
    val modelPath = s"$indexDir/model"
    val codesPath = s"$indexDir/codes"
    val stamp = new org.apache.hadoop.fs.Path(indexDir, "source.json")
    val fs = stamp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def loadModel(): (Map[Int, Seq[Double]], Array[Array[Seq[Double]]]) = {
      val rows = graft.util.ParquetSchemaMemo.read(spark, modelPath)
        .collect()
      val cents = rows.filter(_.getString(0) == "cent")
        .map(r => r.getInt(1) -> r.getSeq[Double](3)).toMap
      val cbRows = rows.filter(_.getString(0) == "cb")
      val mLoaded = cbRows.map(_.getInt(1)).max + 1
      val cb = (0 until mLoaded).map { s =>
        cbRows.filter(_.getInt(1) == s).sortBy(_.getInt(2))
          .map(_.getSeq[Double](3)): Array[Seq[Double]]
      }.toArray
      (cents, cb)
    }
    val existing =
      if (Dedup.readDigestStamp(spark, indexDir).contains(ident))
        try {
          val (cents, cb) = loadModel()
          val codes = graft.util.ParquetSchemaMemo.read(spark, codesPath)
          codes.select("vec_id", "cell", "codes")
          Some(IvfAdcIndex(cents, cb, codes))
        } catch { case scala.util.control.NonFatal(_) => None }
      else None
    existing.getOrElse {
      // stamp deleted FIRST — same crash ordering as the digest sidecar
      fs.delete(stamp, false)
      val base = reference.select(col(idCol).cast("long").as("vec_id"),
        Vectors.toDouble(col(vecCol)).as("__v"))
      val buildScope = CacheScope()
      val (cents, cb, codes) = ivfadcBuild(base, centroidIds, m,
        codewords, iters, buildScope)
      codes.write.mode("overwrite").partitionBy("cell")
        .parquet(codesPath)
      import spark.implicits._
      val modelRows =
        cents.toSeq.map { case (cid, v) => ("cent", cid, -1, v) } ++
          cb.toSeq.zipWithIndex.flatMap { case (words, s) =>
            words.toSeq.zipWithIndex.map { case (w, i) => ("cb", s, i, w) }
          }
      modelRows.toDF("kind", "a", "b", "vec")
        .coalesce(1).write.mode("overwrite").parquet(modelPath)
      buildScope.unpersistAll()
      graft.util.ParquetSchemaMemo.invalidate(codesPath)
      graft.util.ParquetSchemaMemo.invalidate(modelPath)
      val out = fs.create(stamp, true)
      try out.write(s"""{"ident":"$ident"}"""
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
      val (loadedCents, loadedCb) = loadModel()
      IvfAdcIndex(loadedCents, loadedCb,
        graft.util.ParquetSchemaMemo.read(spark, codesPath))
    }
  }

  /** Probe a persisted [[IvfAdcIndex]] with a BATCH of query vectors:
    * per query, nProbe coarse cells rank on the driver against the
    * stored centroids, the ADC tables come from the query's residuals,
    * and each cell's candidates arrive through a partition-pruned scan
    * of the code parquet — the corpus vectors are never re-read
    * (plan-pinned in AnnRecallSpec). `excludeSelfIds` drops corpus
    * rows whose vec_id equals the query id — pass true when the batch
    * shares the corpus id namespace (the recompute-parity shape),
    * false for disjoint batches. */
  def ivfadcTopKAgainstIndex(
      batch: DataFrame, idCol: String, vecCol: String,
      index: IvfAdcIndex, nProbe: Int, k: Int,
      roundDigits: Int = 4, excludeSelfIds: Boolean = false): DataFrame = {
    require(nProbe >= 1 && nProbe <= index.cents.size,
      s"nProbe $nProbe out of [1, ${index.cents.size}]")
    val queries = batch
      .select(col(idCol).cast("long"), Vectors.toDouble(col(vecCol)))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toSeq
      .sortBy(_._1)
    require(queries.nonEmpty, "empty probe batch")
    ivfadcSearch(index.codes, index.cents, index.codebooks, queries,
      nProbe, k, roundDigits, excludeSelfId = excludeSelfIds)
  }

  /** Embedding-space drift: the cosine of every CURRENT-era vector to
    * the REFERENCE era's centroid — when the encoder, the content
    * mix, or an upstream normalization changes, this mean drops
    * before any downstream metric moves. Centroid = per-dim mean,
    * 6dp-rounded (the x110 portability quantize) and collected as
    * dim-bounded driver state; scoring is one map-only pass;
    * per-row cosines round 8dp before the mean so both engines
    * aggregate identical values.
    */
  def embeddingDrift(emb: DataFrame, idCol: String, vecCol: String,
      inRef: Column, threshold: Double = 0.9, centroidDigits: Int = 6,
      roundDigits: Int = 6): DataFrame = {
    val stable = org.apache.spark.sql.types.DecimalType(18, 8)
    val e = emb.filter(inRef.isNotNull)
      .select(inRef.cast("boolean").as("__r"),
        Vectors.toDouble(col(vecCol)).as("v"))
    val cent: Seq[Double] = e.filter(col("__r"))
      .select(posexplode(col("v")).as(Seq("pos", "x")))
      .groupBy(col("pos"))
      .agg(round(avg(col("x")), centroidDigits).as("m"))
      .orderBy("pos").collect().map(_.getDouble(1)).toSeq
    require(cent.nonEmpty, "reference era is empty")
    val nRef = e.filter(col("__r")).count()
    val cNorm = math.sqrt(cent.foldLeft(0.0)((a, x) => a + x * x))
    val cos = round((Vectors.dot(col("v"), typedLit(cent))
      / (sqrt(Vectors.sq(col("v"))) * lit(cNorm))), 8)
    val cur = e.filter(!col("__r"))
      .select(cos.as("__cos"))
      .filter(col("__cos").isNotNull)
    cur.agg(count(lit(1)).as("n_current"),
        sum(col("__cos")).as("__sc"),
        sum(when(col("__cos") < threshold, 1L).otherwise(0L))
          .as("below_threshold"))
      .filter(col("n_current") > 0)
      .select(lit(nRef).as("n_ref"), col("n_current"),
        round((col("__sc") / col("n_current").cast("double"))
          .cast(stable), roundDigits).cast("double").as("mean_cosine"),
        col("below_threshold"),
        round((col("below_threshold").cast("double")
          / col("n_current").cast("double")).cast(stable), roundDigits)
          .cast("double").as("share_below"))
  }

  /** Simplified silhouette per cluster (Hruschka et al. 2004 — the
    * centroid form of Rousseeuw 1987): for each vector, `a` = distance
    * to its own centroid, `b` = distance to the nearest OTHER
    * centroid, `s = (b-a)/max(a,b)` — the "are these clusters real"
    * read after [[kmeans]], at O(n·k) instead of the exact
    * silhouette's O(n²) pairwise distances (which no 100 TB corpus
    * survives). Centroids come from [[kmeansCentroids]] (driver
    * state, quantized per round — the x110 oracle discipline), so the
    * whole score is one map-only pass over the corpus plus a k-row
    * aggregate.
    */
  def silhouetteSimplified(emb: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int, centroidDigits: Int = 6, roundDigits: Int = 6)
      : DataFrame = {
    require(k >= 2, s"silhouette needs k >= 2, got $k")
    val cents = kmeansCentroids(emb, idCol, vecCol, k, iters,
      centroidDigits)
    val stable = org.apache.spark.sql.types.DecimalType(18, 8)
    val e = emb.select(col(idCol).cast("long").as("vec_id"),
      Vectors.toDouble(col(vecCol)).as("v"))
    val vSq = Vectors.sq(col("v"))
    // sorted (d, cidx) structs: item 0 = own cluster, item 1 = nearest
    // other — raw d orders, the sqrt clamps float-cancel negatives
    val dists = array_sort(array(cents.zipWithIndex.map { case (c, i) =>
      val cSq = c.foldLeft(0.0)((acc, x) => acc + x * x)
      struct(
        (vSq - lit(2.0) * Vectors.dot(col("v"), typedLit(c)) + lit(cSq))
          .as("d"),
        lit(i).as("cidx"))
    }: _*))
    val a = sqrt(greatest(dists.getItem(0).getField("d"), lit(0.0d)))
    val b = sqrt(greatest(dists.getItem(1).getField("d"), lit(0.0d)))
    val s = when(greatest(a, b) > 0, (b - a) / greatest(a, b))
      .otherwise(lit(0.0d))
    e.select(dists.getItem(0).getField("cidx").cast("long").as("cluster"),
        s.as("__s"))
      .groupBy(col("cluster"))
      .agg(count(lit(1)).as("n"),
        round((sum(col("__s")) / count(lit(1))).cast(stable), roundDigits)
          .cast("double").as("mean_silhouette"))
      .orderBy(col("cluster"))
  }
}
