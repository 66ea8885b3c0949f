package graft.x

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-radius spatial joins over integer planar coordinates.
  *
  * The curation use case: UMAP/t-SNE-projected embedding grids, tile/patch
  * coordinates from image sharding, or any quantized 2-D key where
  * "points within distance r" is the join predicate. The grid-bucket
  * pattern here is the standard public technique (uniform grid spatial
  * hashing); keeping coordinates INTEGER makes every distance an exact
  * BIGINT, so results are engine- and layout-invariant — no float
  * epsilon at the radius boundary.
  */
object Spatial {

  /** Exact fixed-radius self-join: all pairs (id_a < id_b) with squared
    * euclidean distance ≤ radius², over non-negative integer coordinates.
    *
    * Grid bucketing with cell size = radius: the probe side replicates to
    * its 3×3 cell neighborhood, the build side stays in its own cell —
    * every qualifying pair meets in EXACTLY one (cell, replicate)
    * combination, so no dedup pass is needed, and the join is a plain
    * two-column equi-join on cell coordinates. A naive cross join is
    * O(n²); this is O(n · density) with a constant 9× replication on one
    * side only.
    *
    * Shape at 100 TB: one shuffle each side keyed on (cx, cy); density
    * skew (a hot cell) is bounded by cell area — pick `radius` so a cell
    * holds bounded points, exactly the guidance for every other bucketed
    * join in this library ([[graft.x.Dedup.lshCandidatePairs]]'
    * maxBucket analogue; audit hot cells via [[hotCells]]). Distances
    * are BIGINT products — bit-exact on any engine. */
  def gridNeighborPairs(df: DataFrame, idCol: String, xCol: String,
      yCol: String, radius: Long): DataFrame = {
    require(radius >= 1, s"radius must be >= 1, got $radius")
    val r2 = radius * radius
    val pts = df.select(col(idCol).as("id"),
      col(xCol).cast("long").as("x"), col(yCol).cast("long").as("y"))
    val build = pts.select(col("id").as("id_a"), col("x").as("xa"),
      col("y").as("ya"), (col("x") / radius).cast("long").as("cx"),
      (col("y") / radius).cast("long").as("cy"))
    val probe = pts.select(col("id").as("id_b"), col("x").as("xb"),
        col("y").as("yb"),
        explode(sequence(lit(-1), lit(1))).as("__dx"),
        (col("y") / radius).cast("long").as("__cy0"))
      .select(col("id_b"), col("xb"), col("yb"),
        ((col("xb") / radius).cast("long") + col("__dx")).as("cx"),
        explode(sequence(col("__cy0") - 1, col("__cy0") + 1)).as("cy"))
    build.join(probe, Seq("cx", "cy"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("dist2",
        (col("xa") - col("xb")) * (col("xa") - col("xb")) +
        (col("ya") - col("yb")) * (col("ya") - col("yb")))
      .filter(col("dist2") <= r2)
      .select(col("id_a"), col("id_b"), col("dist2").cast("long").as("dist2"))
  }

  /** Density-based outlier flagging — DBSCAN's core/noise split without
    * the cluster expansion (Ester et al. 1996): a point with fewer than
    * `minPts` neighbors within `radius` is noise. Neighbor counts come
    * from [[gridNeighborPairs]]' bucketed join (each unordered pair
    * counts once per side), so the cost is the O(n · density) grid join
    * plus one id-keyed count — never an all-pairs distance pass. The
    * full DBSCAN clustering would chain cores via the same pair frame
    * into connected components ([[graft.x.Dedup]]'s CC machinery); the
    * noise split alone is the curation-relevant screen (drop isolated
    * embedding-space points / GPS glitches before training). */
  def densityOutliers(df: DataFrame, idCol: String, xCol: String,
      yCol: String, radius: Long, minPts: Int): DataFrame = {
    val pairs = gridNeighborPairs(df, idCol, xCol, yCol, radius)
    val cnt = pairs.select(col("id_a").as("id"))
      .unionAll(pairs.select(col("id_b").as("id")))
      .groupBy("id").agg(count(lit(1)).as("__n"))
    df.select(col(idCol).as("id"), col(xCol).cast("long").as("x"),
        col(yCol).cast("long").as("y"))
      .join(cnt, Seq("id"), "left")
      .select(col("id"), col("x"), col("y"),
        coalesce(col("__n"), lit(0L)).cast("long").as("n_neighbors"),
        (coalesce(col("__n"), lit(0L)) < minPts).as("is_outlier"))
  }

  /** Full DBSCAN clustering (Ester et al. 1996) composed from the
    * engine's own primitives: [[gridNeighborPairs]] for the ε-neighbor
    * frame, the [[densityOutliers]] count for the core test
    * (|N(p)| + 1 ≥ minPts, the point counting itself), and
    * [[Dedup.connectedComponents]] over CORE–CORE edges for cluster
    * labels (min reachable core id — deterministic on any engine).
    * Border points (non-core within ε of ≥ 1 core) take the SMALLEST
    * neighboring core's cluster — the one deterministic refinement of
    * the classic algorithm, whose border assignment is famously
    * scan-order-dependent; everything else is DBSCAN exactly.
    *
    * Shape: one grid join (cell caps auditable via [[hotCells]]), one
    * id-keyed count, a CC whose edge set is matches-not-points
    * (driver union-find under threshold, distributed min-label
    * fallback), two id-keyed label joins. No all-pairs stage. */
  def dbscan(df: DataFrame, idCol: String, xCol: String, yCol: String,
      radius: Long, minPts: Int,
      staging: graft.util.Staging = graft.util.Staging.LocalCheckpoint): DataFrame = {
    require(minPts >= 2, s"minPts must be >= 2, got $minPts")
    val pairs = staging.stage(
      gridNeighborPairs(df, idCol, xCol, yCol, radius).select("id_a", "id_b"),
      "dbscan-pairs")
    val cnt = pairs.select(col("id_a").as("id"))
      .unionAll(pairs.select(col("id_b").as("id")))
      .groupBy("id").agg(count(lit(1)).as("__n"))
    val pts = df.select(col(idCol).cast("long").as("id"),
      col(xCol).cast("long").as("x"), col(yCol).cast("long").as("y"))
    // staged: the counted-points frame feeds the core filter AND the final
    // assembly join — unstaged, the neighbor-count aggregate re-runs per
    // consumer; coreIds then derives narrowly from the staged frame
    val withCnt = staging.stage(pts.join(cnt, Seq("id"), "left")
      .withColumn("__nn", coalesce(col("__n"), lit(0L)))
      .withColumn("__core", col("__nn") + 1 >= minPts), "dbscan-counted")
    val coreIds = withCnt.filter(col("__core")).select("id")
    val corePairs = pairs
      .join(coreIds.withColumnRenamed("id", "id_a"), Seq("id_a"), "left_semi")
      .join(coreIds.withColumnRenamed("id", "id_b"), Seq("id_b"), "left_semi")
    val comp = Dedup.connectedComponents(
      corePairs.select(col("id_a"), col("id_b")), staging = staging)
    // staged: cluster labels feed the border assignment AND the final
    // role/label join
    val coreLabel = staging.stage(coreIds.join(comp, Seq("id"), "left")
      .select(col("id"), coalesce(col("comp"), col("id")).as("cluster")),
      "dbscan-core-labels")
    val adj = pairs.select(col("id_a").as("id"), col("id_b").as("nb"))
      .unionAll(pairs.select(col("id_b").as("id"), col("id_a").as("nb")))
    val borderLabel = adj
      .join(coreLabel.select(col("id").as("nb"), col("cluster").as("__bc")), "nb")
      .groupBy("id").agg(min("__bc").as("__bc"))
    withCnt
      .join(coreLabel.withColumnRenamed("cluster", "__cc"), Seq("id"), "left")
      .join(borderLabel, Seq("id"), "left")
      .select(col("id"), col("x"), col("y"),
        col("__nn").cast("long").as("n_neighbors"),
        when(col("__core"), "core")
          .when(col("__bc").isNotNull, "border")
          .otherwise("noise").as("role"),
        when(col("__core"), col("__cc")).otherwise(col("__bc"))
          .cast("long").as("cluster"))
  }

  /** Audit surface for [[gridNeighborPairs]]' density skew: cells holding
    * more than `maxCell` points — the quadratic hot spots, reported
    * before they become the join's straggler task. */
  def hotCells(df: DataFrame, xCol: String, yCol: String, radius: Long,
      maxCell: Int): DataFrame =
    df.groupBy((col(xCol).cast("long") / radius).cast("long").as("cx"),
        (col(yCol).cast("long") / radius).cast("long").as("cy"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") > maxCell)
      .orderBy(col("n").desc)
}
