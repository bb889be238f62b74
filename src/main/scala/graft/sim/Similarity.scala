package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (ArrayType(FloatType)).
  *
  * Scale design: the brute-force path is the CORRECTNESS baseline (query
  * set × corpus via broadcast of the small query side — never corpus ×
  * corpus); the scale path is IVF-style partition pruning: join only within
  * a coarse cluster (here the `label` column as the quantizer cell), which
  * turns the O(Q·N) scan into O(Q·N/cells) after one shuffle on the cell
  * id. All arithmetic is float→double cast then sequential fold — the exact
  * dot product any engine reproduces.
  */
object Similarity {

  /** IVF coarse quantization: fit KMeans centroids (the inverted-file
    * cell structure) and assign every vector to its cell. `assignCells`
    * can then probe the query's nearest `nprobe` cells — the standard
    * recall/speed dial of IVF indexes.
    */
  def kmeansCells(df: DataFrame, vecCol: String, k: Int, seed: Long = 42L)
      : (DataFrame, Array[Array[Double]]) = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.linalg.Vectors
    import org.apache.spark.sql.functions.udf
    val toVec = udf((a: Seq[Float]) =>
      Vectors.dense(a.map(_.toDouble).toArray))
    val feat = df.withColumn("_features", toVec(col(vecCol)))
    val model = new KMeans().setK(k).setSeed(seed)
      .setFeaturesCol("_features").setPredictionCol("_cell").fit(feat)
    val assigned = model.transform(feat)
      .withColumn("cell", col("_cell")).drop("_features", "_cell")
    (assigned, model.clusterCenters.map(_.toArray))
  }

  /** Per-group element-wise mean of an embedding column, each component
    * rounded to 6 decimals — the centroid table for outlier filtering
    * (distance-to-own-centroid) and coarse quantization.
    *
    * Plan shape: posexplode (×dim scan amplification, no extra pass),
    * one map-side-combinable (group, position) average — the shuffle
    * carries at most groups×dim partial sums regardless of corpus size —
    * then a bounded collect_list rebuild of the array. The per-component
    * round(…, 6) pins the centroid against float-summation order before
    * anything downstream consumes it: 6 decimals is ~9 orders of
    * magnitude above the ulp drift a re-ordered sum can introduce, so
    * the rounded centroid is engine-reproducible.
    */
  def groupCentroids(df: DataFrame, groupCol: String,
                     vecCol: String = "embedding"): DataFrame =
    df.select(col(groupCol), posexplode(col(vecCol)))
      .groupBy(col(groupCol), col("pos"))
      .agg(round(avg(col("col").cast("double")), 6).as("_m"))
      .groupBy(col(groupCol))
      .agg(transform(sort_array(collect_list(struct(col("pos"), col("_m")))),
        e => e.getField("_m")).as("centroid"))

  /** Cell ids of the `nprobe` nearest centroids for one query vector. */
  def probeCells(vec: Seq[Float], centroids: Array[Array[Double]],
                 nprobe: Int): Seq[Int] = {
    val v = vec.map(_.toDouble).toArray
    centroids.zipWithIndex.map { case (c, i) =>
      var d = 0.0
      var j = 0
      while (j < v.length) { val t = v(j) - c(j); d += t * t; j += 1 }
      (d, i)
    }.sortBy(_._1).take(nprobe).map(_._2).toSeq
  }

  /** Deterministic 16-bit hyperplane-sign sketch of an embedding (the
    * SimHash construction for the cosine metric): bit j is the sign of the
    * dot product with hyperplane j, whose components are ±1 from the md5
    * parity of "j|i" — reproducible in any engine with md5, so the DuckDB
    * oracle computes the identical sketch. Scan-local (no shuffle); one
    * native [[HyperplaneSketch16]] pass (the 16 interpreted
    * `zip_with`+`aggregate` chains of the HOF twin read the vector 16
    * times through per-element lambda boxing).
    */
  def hyperplaneSketch16(vecCol: Column, dim: Int): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
    column(HyperplaneSketch16(expression(vecCol), dim))
  }

  /** Composed-expression twin of [[hyperplaneSketch16]] (semantic
    * cross-check — see SketchParitySpec).
    */
  def hyperplaneSketch16Hof(vecCol: Column, dim: Int): Column = {
    val md = java.security.MessageDigest.getInstance("MD5")
    def sign(j: Int, i: Int): Double = {
      md.reset()
      val d = md.digest(s"$j|$i".getBytes("UTF-8"))
      if (((d(0) >> 4) & 0xf) >= 8) 1.0 else -1.0
    }
    (0 until 16).map { j =>
      val plane = array((0 until dim).map(i => lit(sign(j, i))): _*)
      val dotJ = aggregate(
        zip_with(vecCol, plane, (x, h) => x.cast("double") * h),
        lit(0.0), (acc, v) => acc + v)
      when(dotJ > 0, lit(1 << j)).otherwise(lit(0))
    }.reduce(_ + _).cast("int")
  }

  /** Embedding-cosine near-dup pairs, scale-first: sketch each vector
    * (scan-local), take candidates from the Hamming-<=2 ball over DISTINCT
    * sketches ([[graft.dedup.DedupOps.simhashHammingPairs]] — bounded by
    * the 2^16 sketch space at any corpus size), and verify with the exact
    * cosine on candidates only. Never an all-pairs join over vectors.
    */
  def nearDupPairs(emb: DataFrame, threshold: Double, dim: Int = 64,
                   maxHamming: Int = 2, idCol: String = "vec_id",
                   vecCol: String = "embedding"): DataFrame = {
    val sk = emb.select(col(idCol),
      hyperplaneSketch16(col(vecCol), dim).as("sketch"))
    val cand = graft.dedup.DedupOps.simhashHammingPairs(
      sk, idCol, "sketch", maxHamming)
    val a = emb.select(col(idCol).as("id_a"), col(vecCol).as("_va"))
    val b = emb.select(col(idCol).as("id_b"), col(vecCol).as("_vb"))
    cand.join(a, Seq("id_a")).join(b, Seq("id_b"))
      .withColumn("sim", round(cosine(col("_va"), col("_vb")), 6))
      .filter(col("sim") >= threshold)
      .select(col("id_a"), col("id_b"), col("hamming"), col("sim"))
  }

  /** Semantic dedup (the SemDeDup recipe): bucket the embedding space by
    * the low `bucketBits` md5-parity hyperplane signs (engine-portable;
    * each plane is an independent additive term of the 16-bit sketch, so
    * the bucket = sketch16 masked to its low bits), then drop any vector
    * whose bucket holds a LOWER-id vector at rounded cosine >=
    * `threshold`. Deterministic one-pass keep rule — no transitive
    * chasing; the kept set is exactly `n_close = 0`.
    *
    * Scale shape: ONE shuffle (bucket member lists via collect_list, the
    * q32 band pattern), pairs generated scan-local off the lists, one
    * combinable count, one left join back. Per-bucket work is quadratic
    * in bucket size by SemDeDup's small-cluster contract, so buckets are
    * capped at `maxBucket` with a loud error — a denser corpus raises
    * the bucket granularity (more sketch bits, or IVF cells as in
    * [[kmeansCells]]) exactly the way LSH raises bands.
    */
  def semanticDedup(emb: DataFrame, threshold: Double, dim: Int = 64,
                    bucketMask: Int = 255, maxBucket: Int = 4096,
                    idCol: String = "vec_id",
                    vecCol: String = "embedding"): DataFrame = {
    val sk = emb.select(col(idCol), col(vecCol),
      hyperplaneSketch16(col(vecCol), dim)
        .bitwiseAND(lit(bucketMask)).as("bucket"))
    val close = sk
      .groupBy(col("bucket"))
      .agg(collect_list(struct(col(idCol).as("id"),
        col(vecCol).as("v"))).as("ms"))
      .filter(size(col("ms")) > 1)
      .filter(assert_true(size(col("ms")) <= lit(maxBucket),
        concat(lit("semantic-dedup bucket exceeds "), lit(maxBucket),
          lit(" vectors (got "), size(col("ms")),
          lit("): raise the sketch bit granularity — see " +
            "Similarity.semanticDedup scaladoc"))).isNull)
      .select(explode(col("ms")).as("a"), col("ms"))
      .select(col("a"), explode(col("ms")).as("b"))
      .filter(col("a.id") > col("b.id"))
      .filter(round(cosine(col("a.v"), col("b.v")), 6) >= threshold)
      .select(col("a.id").as(idCol))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_close"))
    sk.select(col(idCol), col("bucket"))
      .join(close, Seq(idCol), "left")
      .select(col(idCol), col("bucket"),
        coalesce(col("n_close"), lit(0L)).as("n_close"),
        col("n_close").isNull.as("keep"))
  }

  /** Cosine similarity — native one-pass [[DotCosine]] expression (the
    * interpreted HOF lambda arithmetic was the entire q35 cost; the fused
    * loop is bit-identical — see [[DotCosine]]'s scaladoc and the
    * CosineParitySpec pin).
    */
  def cosine(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
    column(DotCosine(expression(a), expression(b)))
  }

  /** Sequential-fold dot product in double precision (HOF cross-check
    * twin of [[DotCosine]]'s fused loop).
    */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, v) => acc + v))

  /** Composed-expression cosine (zip_with + aggregate lambdas; ~10x slower
    * than [[cosine]] but useful as a semantic cross-check).
    */
  def cosineHof(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Bounded top-k per group via the [[TopKByScore]] native aggregate:
    * map-side partial k-heaps mean only k rows per map task per group
    * reach the shuffle, and no single task ever holds a query's full
    * candidate set (the `row_number` window it replaces funneled each
    * query's whole candidate list into one task — an OOM at corpus
    * scale). Emits (groupCols..., cId, sim, rnk) ranked by
    * (sim desc, cId asc).
    *
    * Null-score contract: rows with null `sim` (e.g. cosine of a
    * zero-norm vector) are EXCLUDED from the ranking — filtered
    * explicitly here, and the oracle SQL filters identically — so a
    * group can emit fewer than k rows (never null-score placeholders,
    * which a nulls-last window would emit when k exceeds the non-null
    * count).
    */
  private def finishTopK(in: DataFrame, k: Int, qId: String,
                         cId: String, extraGroupCols: Seq[String]): DataFrame = {
    val joined = in.filter(col("sim").isNotNull)
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    // the bounded aggregate ranks by a LONG id; fail fast on other id
    // types instead of letting the cast return nulls (dropping every row)
    joined.schema(cId).dataType match {
      case ByteType | ShortType | IntegerType | LongType => ()
      case other => throw new IllegalArgumentException(
        s"topK id column '$cId' must be integral (got $other); map ids to " +
          "long before ranking")
    }
    val agg = column(TopKByScore(expression(col("sim")),
      expression(col(cId).cast("long")), k).toAggregateExpression())
    val groupCols = (qId +: extraGroupCols).map(col)
    joined.groupBy(groupCols: _*)
      .agg(agg.as("_top"))
      .select(groupCols :+ posexplode(col("_top")): _*)
      .select((groupCols :+ col("col.id").as(cId)
        :+ col("col.score").as("sim")
        :+ (col("pos") + 1).cast("int").as("rnk")): _*)
  }

  /** Brute-force top-k cosine neighbors of each query vector.
    * `queries` is expected to be small (broadcast); ties break on
    * neighbor id after rounding, so ranking is engine-reproducible.
    */
  def topK(queries: DataFrame, corpus: DataFrame, k: Int,
           qId: String = "q_id", cId: String = "vec_id",
           qVec: String = "q_vec", cVec: String = "embedding"): DataFrame = {
    val joined = corpus.join(broadcast(queries), col(qId) =!= col(cId))
      .withColumn("sim", round(cosine(col(qVec), col(cVec)), 6))
    finishTopK(joined, k, qId, cId, Nil)
      .select(col(qId), col(cId), col("sim"), col("rnk"))
  }

  /** IVF-style top-k: restrict candidates to the query's coarse cell
    * (one equi-join shuffle on the cell id instead of a full scan per
    * query — the 100 TB-shaped variant).
    */
  def topKWithinCell(queries: DataFrame, corpus: DataFrame, k: Int,
                     cell: String, qId: String = "q_id",
                     cId: String = "vec_id", qVec: String = "q_vec",
                     cVec: String = "embedding"): DataFrame = {
    val joined = corpus.join(broadcast(queries), Seq(cell))
      .filter(col(qId) =!= col(cId))
      .withColumn("sim", round(cosine(col(qVec), col(cVec)), 6))
    finishTopK(joined, k, qId, cId, Seq(cell))
      .select(col(qId), col(cell), col(cId), col("sim"), col("rnk"))
  }

  /** Static corpus bucket index for ingestion-time SEMANTIC admission
    * (the embedding twin of [[graft.dedup.DedupOps.bandIndex]]): one row
    * per hyperplane-sketch bucket holding the bucket's member list
    * (id + vector) as the broadcastable probe payload, id-sorted so the
    * index artifact is deterministic. Bucket lists carry the same cap as
    * [[semanticDedup]] (SemDeDup's small-cluster contract), so index
    * size is bounded by #occupied-buckets × maxBucket — at 100 TB the
    * index holds the KEPT representatives (the deduped set), is rebuilt
    * per corpus snapshot and broadcast per micro-batch; past broadcast
    * budget, raise the bucket granularity or quantize the stored vectors
    * ([[QuantizeInt8]], 4× smaller) before sharding the index.
    */
  def bucketIndex(corpus: DataFrame, idCol: String = "vec_id",
                  vecCol: String = "embedding", dim: Int = 64,
                  bucketMask: Int = 255, maxBucket: Int = 4096): DataFrame =
    corpus.select(col(idCol).as("id"), col(vecCol).as("v"),
        hyperplaneSketch16(col(vecCol), dim)
          .bitwiseAND(lit(bucketMask)).as("bucket"))
      .groupBy(col("bucket"))
      .agg(sort_array(collect_list(struct(col("id"), col("v"))))
        .as("cands"))
      .filter(assert_true(size(col("cands")) <= lit(maxBucket),
        concat(lit("bucket index exceeds maxBucket="), lit(maxBucket),
          lit(" vectors (got "), size(col("cands")),
          lit("): raise the sketch bit granularity — see " +
            "Similarity.semanticDedup scaladoc"))).isNull)

  /** Probes every vector of `docs` — a STREAM or a batch frame — against
    * a static [[bucketIndex]]: the arriving vector's sketch bucket is
    * computed scan-local, the index rides ONE broadcast left-join on the
    * bucket id, and the cosine verify plus the candidate aggregation run
    * as array lambdas INSIDE the row — no state store, no watermark, no
    * streaming aggregation (the stream-static shape of q78 run at the
    * ingestion door). Appends `n_close` (verified corpus members),
    * `closest_id` (smallest of them, null when none) and
    * `is_semantic_dup`.
    */
  def probeBucketIndex(docs: DataFrame, index: DataFrame, threshold: Double,
                       dim: Int = 64, bucketMask: Int = 255,
                       vecCol: String = "embedding"): DataFrame = {
    import org.apache.spark.sql.types.{ArrayType, StructType}
    val idType = index.schema("cands").dataType.asInstanceOf[ArrayType]
      .elementType.asInstanceOf[StructType]("id").dataType
    val closeIds = coalesce(
      transform(filter(col("_cands"), x =>
        round(cosine(col(vecCol), x.getField("v")), 6) >= threshold),
        x => x.getField("id")),
      array().cast(ArrayType(idType)))
    docs
      .withColumn("_bucket", hyperplaneSketch16(col(vecCol), dim)
        .bitwiseAND(lit(bucketMask)))
      .join(broadcast(index.select(col("bucket").as("_bucket"),
        col("cands").as("_cands"))), Seq("_bucket"), "left")
      .withColumn("_close", closeIds)
      .withColumn("n_close", size(col("_close")).cast("long"))
      .withColumn("closest_id", array_min(col("_close")))
      .withColumn("is_semantic_dup", col("n_close") > 0)
      .drop("_bucket", "_cands", "_close")
  }

  /** Hard-negative mining for contrastive training: for EVERY vector, the
    * top-k most-cosine-similar vectors carrying a DIFFERENT label. Unlike
    * [[topK]] the anchor side is the whole corpus, so nothing here may be
    * broadcast: candidates come from the anchor's hyperplane-sketch
    * bucket (the low `bucketMask` bits of the deterministic md5-parity
    * sketch — same-bucket vectors ARE the near-cosine ones, which is
    * exactly where hard negatives live), via one corpus×corpus equi-join
    * SHUFFLED on the bucket id. Per-anchor ranking is the bounded
    * [[TopKByScore]] k-heap with map-side partial combine, so the m²
    * per-bucket pair stream is consumed as it is produced — at most k
    * rows per anchor per partition ever reach the final shuffle. A denser
    * corpus raises the bucket granularity (wider mask / more sketch
    * bits / IVF cells via [[kmeansCells]]) exactly the way LSH raises
    * bands; AQE's skew-join split handles residual bucket skew.
    *
    * Anchors whose bucket holds no different-label vector emit no rows
    * (they have no in-bucket negative), and null cosines (zero-norm
    * vectors) are excluded from ranking per [[finishTopK]]'s contract.
    * Ties break on (sim desc, id asc) after rounding — engine-portable.
    */
  def hardNegatives(emb: DataFrame, k: Int, dim: Int = 64,
                    bucketMask: Int = 255, idCol: String = "vec_id",
                    labelCol: String = "label",
                    vecCol: String = "embedding"): DataFrame = {
    val sk = emb.select(col(idCol), col(labelCol), col(vecCol),
      hyperplaneSketch16(col(vecCol), dim)
        .bitwiseAND(lit(bucketMask)).as("bucket"))
    val anchors = sk.select(col(idCol).as("q_id"), col(labelCol).as("_ql"),
      col(vecCol).as("q_vec"), col("bucket"))
    val cands = sk.select(col(idCol).as("vec_id"), col(labelCol).as("_cl"),
      col(vecCol).as("_c_vec"), col("bucket"))
    val joined = cands.join(anchors, Seq("bucket"))
      .filter(col("_ql") =!= col("_cl"))
      .withColumn("sim", round(cosine(col("q_vec"), col("_c_vec")), 6))
    finishTopK(joined, k, "q_id", "vec_id", Nil)
      .select(col("q_id"), col("vec_id"), col("sim"), col("rnk"))
  }
}
